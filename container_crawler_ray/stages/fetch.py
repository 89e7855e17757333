"""Fetch stage: actor-pool map_batches with the pluggable handler protocol
(T1/M2/M3 and the §2.10 user-extension surface).

Reference shape [recon: ``container_crawler/base_sync.py:≈10–100``,
``__init__.py:≈260–310``]: a handler object constructed per (container,
pass) with ``handle(row_or_rows, client)``; ``bulk_process=True`` sends the
whole chunk in one call, else each row is queued to a worker pool;
``RetryError`` / exceptions mark the chunk for retry.

Ray-Data re-expression:
- ``FetchStage`` is a callable CLASS → actor pool. ``__init__`` constructs
  the handler once per actor (``setup(ctx)``), resolving broadcast state
  (robots) from a ``ray.put`` ref.
- bulk mode → ``batch_size=None`` (one ``handle_batch`` per block);
  per-row mode → bounded ``batch_size`` and a per-row loop with PER-ROW
  error capture into an ``error`` column (exceptions never kill the task,
  mirroring the reference's error list).
- output is columnar: ok/error/doc_id/spans/links appended to the input
  batch; only rows tagged ``scheduled`` are fetched, everything else
  passes through (so one materialized pass result carries all branches).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray

from ..schemas import SPAN_STRUCT
from ..sources import synth


class RetryError(Exception):
    """Handler-raised: row must be retried next pass (reference
    ``container_crawler/exceptions.py:≈1–10`` [recon])."""


class SkipContainer(Exception):
    """Handler-raised at construction: skip this partition/host this pass."""


class FetchHandler:
    """User-extension surface. Subclass and override."""

    def setup(self, ctx: dict) -> None:  # once per actor
        self.ctx = ctx

    def handle_row(self, row: dict) -> dict:
        """Per-row mode: return {spans, links, size}; raise RetryError to
        send the row to the retry queue."""
        raise NotImplementedError

    def handle_batch(self, rows: list[dict]) -> list[dict]:
        """Bulk mode default: loop handle_row but fail the whole chunk on
        first error (the reference's bulk handle(rows) is all-or-nothing)."""
        return [self.handle_row(r) for r in rows]


class SimulatedFetchHandler(FetchHandler):
    """Deterministic closed-world fetcher (FIXTURES.md §3/§5): spans, links
    and transient first-attempt failures are pure functions of the
    canonical URL. ``parse_cost_bytes`` adds realistic CPU per fetch (an
    md5 seeded with the URL over a shared read-only buffer) so benches
    measure compute, not overhead. The buffer is allocated ONCE per
    worker (``setup``), not per URL — per-row multi-MiB allocations are
    memory-bandwidth-bound and would make the cost model measure the
    allocator instead of the hash."""

    def __init__(self, n_hosts: int, n_paths: int, fail_mod: int,
                 parse_cost_bytes: int = 0):
        self.n_hosts = n_hosts
        self.n_paths = n_paths
        self.fail_mod = fail_mod
        self.parse_cost_bytes = parse_cost_bytes
        self._buf: bytes | None = None

    def setup(self, ctx: dict) -> None:
        super().setup(ctx)
        if self.parse_cost_bytes:
            self._buf = b"\xa5" * self.parse_cost_bytes

    def handle_row(self, row: dict) -> dict:
        url = row["canonical_url"]
        if row["attempts"] == 0 and synth.fails_first_attempt(url, self.fail_mod):
            raise RetryError(f"transient fetch error: {url}")
        if self.parse_cost_bytes:
            import hashlib
            if self._buf is None:       # driver-side / un-setup use
                self._buf = b"\xa5" * self.parse_cost_bytes
            h = hashlib.md5(url.encode())
            h.update(self._buf)
            h.digest()
        return {
            "spans": synth.make_spans(url),
            "links": synth.out_links(url, self.n_hosts, self.n_paths),
        }


def apply_fetch(handler: FetchHandler, bulk: bool, t: pa.Table) -> pa.Table:
    """The fetch kernel shared by the actor-pool stage and the task-mode
    function: fetch rows tagged ``scheduled``, per-row (errors captured per
    row) or bulk (one handle_batch per chunk, all-or-nothing)."""
    n = len(t)
    sched = np.asarray(t.column("sched").to_pylist())
    todo = np.flatnonzero(sched == "scheduled")
    ok = np.zeros(n, dtype=bool)
    err = [""] * n
    spans: list = [None] * n
    links: list = [None] * n
    if len(todo):
        rows = t.take(pa.array(todo)).to_pylist()
        if bulk:
            try:
                results = handler.handle_batch(rows)
                for i, r in zip(todo, results):
                    ok[i] = True
                    spans[i] = r["spans"]
                    links[i] = r["links"]
            except Exception as e:  # noqa: BLE001 — incl. RetryError
                msg = f"{type(e).__name__}: {e}"
                for i in todo:
                    err[i] = msg
        else:
            for i, row in zip(todo, rows):
                try:
                    r = handler.handle_row(row)
                    ok[i] = True
                    spans[i] = r["spans"]
                    links[i] = r["links"]
                except Exception as e:  # noqa: BLE001
                    err[i] = f"{type(e).__name__}: {e}"
    uh = t.column("url_hash").to_numpy()
    doc_id = [f"{int(h):016x}" if ok[i] else "" for i, h in enumerate(uh)]
    t = t.append_column("ok", pa.array(ok))
    t = t.append_column("error", pa.array(err, type=pa.string()))
    t = t.append_column("doc_id", pa.array(doc_id, type=pa.string()))
    t = t.append_column("spans", pa.array(spans, type=pa.list_(SPAN_STRUCT)))
    t = t.append_column("links", pa.array(links, type=pa.list_(pa.string())))
    return t


class FetchStage:
    """Actor-pool form (T1): handler constructed + ``setup`` ONCE per actor.
    Use for handlers with expensive state (models, sessions, robots
    caches)."""

    def __init__(self, handler: FetchHandler, bulk_process: bool,
                 ctx_ref=None):
        self.handler = handler
        self.bulk = bulk_process
        ctx = ray.get(ctx_ref) if ctx_ref is not None else {}
        self.handler.setup(ctx)

    def __call__(self, t: pa.Table) -> pa.Table:
        return apply_fetch(self.handler, self.bulk, t)


# Task-mode form: stateless elastic tasks with a per-worker-process handler
# cache — the right idiom when the handler is cheap to build; tasks soak up
# whatever CPUs the other stages leave free, with no pool sizing to tune.
_HANDLERS: dict = {}


def make_fetch_fn(handler_ref, bulk: bool):
    def fetch(t: pa.Table) -> pa.Table:
        key = handler_ref.hex()
        h = _HANDLERS.get(key)
        if h is None:
            h = ray.get(handler_ref)
            h.setup({})
            if len(_HANDLERS) > 8:
                _HANDLERS.clear()
            _HANDLERS[key] = h
        return apply_fetch(h, bulk, t)

    return fetch
