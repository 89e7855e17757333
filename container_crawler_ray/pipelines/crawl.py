"""The crawl driver: one pass = one Ray Data round; the BFS loop lives on
the driver (Ray Data DAGs are acyclic — SURVEY.md §4.3), exactly mirroring
the reference's poll-pass structure [recon:
``container_crawler/__init__.py:≈100–330`` run_always/run_once/
handle_container/process_items].

Per-pass dataflow (each box a Ray Data stage; candidates are bounded by
``num_partitions × items_chunk + |retry|`` — the reference's micro-batch
invariant — so per-pass materializations are bounded regardless of
frontier size):

    read_parquet(frontier fragments, filter=rowid > min(wm))
      → map_batches(watermark filter, vectorized)                 [S1]
      → groupby(partition_id).map_groups(sort rowid, head chunk)  [O3]
      → union(retry re-injections)                                [J3]
      → map_batches(mod-ownership tag)                            [M1]
      → map_batches(SeenProbeStage actor pool)                    [J1]
      → groupby(host).map_groups(politeness/robots/top-k)    [O1/T6/J2/M5]
      → map_batches(SeenMarkStage actor pool)                     [T5]
      → map_batches(FetchStage actor pool, bulk|per-row)     [T1/M2/M3]
      → materialize (the bounded pass result)

then derived branches (documents sink, link explosion → frontier append,
retry table, metrics/lineage, watermark gating) and an atomic checkpoint
whose commit point is meta.json (kill anywhere → exact resume).

Watermark semantics (the critical reference invariant [recon:
``__init__.py:≈310–330``]): a partition's watermark advances to the max
scanned rowid IFF no gating error occurred in its chunk (fetch errors of
scan-branch rows + verification misses). Errors leave the watermark
untouched → the chunk is rescanned next pass; already-scheduled rows are
dropped by the seen set (at-least-once ∧ seen-set ⇒ effectively-once) and
failed rows re-enter via the retry queue with attempts+1.
"""

from __future__ import annotations

import time
import uuid
from dataclasses import dataclass, field

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data
from ray.data.aggregate import Count, Max, Min, Sum

from ..config import CrawlConfig
from ..functions.canonicalize import canonicalize_many, host_of
from ..functions.hashing import hash64_many
from ..schemas import BUCKETS, CHECKPOINTS, FRONTIER, LINEAGE, METRICS, RETRY
from ..sources import synth
from ..stages.fetch import FetchStage, SimulatedFetchHandler
from ..stages.links import explode_links, make_link_enrich, make_rowid_assigner
from ..stages.politeness import make_schedule_fn
from ..stages.probe import SeenProbeStage, SeenMarkStage
from ..stages.scan import make_chunk_fn, make_watermark_filter
from ..state.seen import SeenSet
from ..storage import TableStore

CAND_COLS = [f.name for f in RETRY] + ["src"]


@dataclass
class CrawlState:
    run_id: str
    pass_id: int
    watermarks: dict[int, int]
    next_rowid: dict[int, int]
    buckets: dict[str, float]
    robots: dict[str, dict]
    seen: SeenSet
    salted_hosts: tuple = ()


# --------------------------------------------------------------------- init
def build_frontier_rows(urls: list[str], cfg: CrawlConfig, depth: int = 0,
                        priorities: list[float] | None = None) -> pa.Table:
    """Enrich raw URLs into FRONTIER rows (without rowids). Seed priority is
    hash64(RAW url)%1000/1000 per FIXTURES.md §1 — non-canonical variants
    get their own priority; the per-pass dedup picks the min-rowid copy."""
    canon = canonicalize_many(urls)
    hosts = [host_of(c) for c in canon]
    uh = hash64_many(canon)
    hh = hash64_many(hosts)
    P = np.uint64(cfg.num_partitions)
    pid = (hh % P).astype(np.int32)
    if cfg.salted_hosts:
        salted = set(cfg.salted_hosts)
        mask = np.array([h in salted for h in hosts])
        if mask.any():
            pid[mask] = (uh[mask] % P).astype(np.int32)
    if priorities is None:
        raw_h = hash64_many(urls)
        priorities = ((raw_h % np.uint64(1000)).astype(np.float32) / 1000.0)
    return pa.table(
        {
            "partition_id": pa.array(pid, type=pa.int32()),
            "url": pa.array(urls, type=pa.string()),
            "canonical_url": pa.array(canon, type=pa.string()),
            "host": pa.array(hosts, type=pa.string()),
            "url_hash": pa.array(uh, type=pa.uint64()),
            "host_hash": pa.array(hh, type=pa.uint64()),
            "priority": pa.array(np.asarray(priorities, dtype=np.float32)),
            "depth": pa.array(np.full(len(urls), depth, dtype=np.int32)),
        }
    )


def assign_seed_rowids(rows: pa.Table, next_rowid: dict[int, int],
                       pass_id: int = 0) -> pa.Table:
    """Per-partition rowids in list (append) order — each partition is an
    independent rowid sequence, like one container DB per replica."""
    pid = rows.column("partition_id").to_numpy()
    rowid = np.zeros(len(rows), dtype=np.int64)
    counters = dict(next_rowid)
    for i, p in enumerate(pid):
        p = int(p)
        c = counters.get(p, 0)
        rowid[i] = c
        counters[p] = c + 1
    next_rowid.clear()
    next_rowid.update(counters)
    out = rows.append_column("pass_added",
                             pa.array(np.full(len(rows), pass_id, dtype=np.int64)))
    out = out.append_column("rowid", pa.array(rowid))
    return out.select([f.name for f in FRONTIER])


def init_run(root: str, cfg: CrawlConfig, seed_urls: list[str],
             robots: dict[str, dict] | None = None) -> tuple[TableStore, CrawlState]:
    store = TableStore(root)
    state = CrawlState(
        run_id=uuid.uuid4().hex[:12],
        pass_id=0,
        watermarks={p: -1 for p in range(cfg.num_partitions)},
        next_rowid={},
        buckets={},
        robots=robots if robots is not None else synth.robots_lookup(cfg.n_hosts),
        seen=SeenSet(uuid.uuid4().hex[:12], cfg.seen_shards,
                     cfg.cuckoo_capacity, cfg.bloom_bits),
        salted_hosts=cfg.salted_hosts,
    )
    rows = build_frontier_rows(seed_urls, cfg)
    seed_tbl = assign_seed_rowids(rows, state.next_rowid, pass_id=0)
    store.append_fragment("frontier", seed_tbl, 0, tag="append",
                          meta=_frontier_meta(seed_tbl))
    _write_state_fragments(store, cfg, state)
    store.write_meta({"pass_id": 0, "run": "initialized",
                      "num_partitions": cfg.num_partitions})
    return store, state


def resume_run(root: str, cfg: CrawlConfig) -> tuple[TableStore, CrawlState]:
    """Exact resume from the last committed pass: every state table is read
    at the meta.json pass version; later (torn) fragments are ignored and
    will be overwritten when the pass re-runs."""
    store = TableStore(root)
    meta = store.read_meta()
    assert meta is not None, "no meta.json — nothing to resume"
    p = meta["pass_id"]
    ck = store.read_fragment("checkpoints", "ckpt", p)
    state = CrawlState(
        run_id=uuid.uuid4().hex[:12],
        pass_id=p,
        watermarks={}, next_rowid={}, buckets={},
        robots=synth.robots_lookup(cfg.n_hosts),
        seen=SeenSet(uuid.uuid4().hex[:12], cfg.seen_shards,
                     cfg.cuckoo_capacity, cfg.bloom_bits),
        salted_hosts=cfg.salted_hosts,
    )
    for row in ck.to_pylist():
        state.watermarks[row["partition_id"]] = row["last_row"]
        state.next_rowid[row["partition_id"]] = row["next_rowid"]
    bk = store.read_fragment("buckets", "buckets", p)
    if bk is not None:
        state.buckets = dict(zip(bk.column("host").to_pylist(),
                                 bk.column("tokens").to_pylist()))
    sn = store.read_fragment("seen_shards", "seen", p)
    if sn is not None and len(sn):
        state.seen.restore_from_table(sn)
    return store, state


def _frontier_meta(t: pa.Table) -> dict:
    if len(t) == 0:
        return {"max_rowid": -1}
    return {"max_rowid": int(pc.max(t.column("rowid")).as_py())}


def _write_state_fragments(store: TableStore, cfg: CrawlConfig,
                           state: CrawlState,
                           retry_tbl: pa.Table | None = None) -> None:
    p = state.pass_id
    parts = sorted(state.watermarks)
    ck = pa.table(
        {
            "partition_id": pa.array(parts, type=pa.int32()),
            "db_id": [f"db-{q:04d}" for q in parts],
            "last_row": pa.array([state.watermarks[q] for q in parts],
                                 type=pa.int64()),
            "next_rowid": pa.array([state.next_rowid.get(q, 0) for q in parts],
                                   type=pa.int64()),
            "pass_id": pa.array([p] * len(parts), type=pa.int64()),
        },
        schema=CHECKPOINTS,
    )
    store.append_fragment("checkpoints", ck, p, tag="ckpt")
    hosts = sorted(state.buckets)
    bk = pa.table(
        {"host": hosts,
         "tokens": pa.array([state.buckets[h] for h in hosts], type=pa.float64())},
        schema=BUCKETS,
    )
    store.append_fragment("buckets", bk, p, tag="buckets")
    store.append_fragment("seen_shards", state.seen.snapshot_table(), p, tag="seen")
    if retry_tbl is not None:
        store.append_fragment("retry", retry_tbl, p, tag="retry")
    for name, tag in (("checkpoints", "ckpt"), ("buckets", "buckets"),
                      ("seen_shards", "seen"), ("retry", "retry")):
        store.gc_state_fragments(name, tag, p - 1)


# --------------------------------------------------------------------- pass
def _add_cand_cols(src: str):
    def f(t: pa.Table) -> pa.Table:
        n = len(t)
        if "attempts" not in t.column_names:
            t = t.append_column("attempts",
                                pa.array(np.zeros(n, dtype=np.int32)))
            t = t.append_column("last_error",
                                pa.array([""] * n, type=pa.string()))
        t = t.append_column("src", pa.array([src] * n, type=pa.string()))
        return t.select(CAND_COLS)

    return f


def _make_owned_fn(num_nodes: int, node_id: int):
    def f(t: pa.Table) -> pa.Table:
        rowid = t.column("rowid").to_numpy()
        owned = (rowid % num_nodes) == node_id
        return t.append_column("owned", pa.array(owned))

    return f


_OWN_TAGS = ("scheduled", "deferred", "disallowed", "skipped_host", "dup", "seen")


def _partial_stats(t: pa.Table) -> pa.Table:
    """Per-batch partial aggregates (one row per partition per batch) —
    pre-aggregation before the tiny groupby (SURVEY.md §2.5 A2)."""
    pid = t.column("partition_id").to_numpy()
    src = np.asarray(t.column("src").to_pylist())
    sched = np.asarray(t.column("sched").to_pylist())
    ok = t.column("ok").to_numpy()
    rowid = t.column("rowid").to_numpy()
    is_scan = src == "scan"
    err_gate = (is_scan & (sched == "scheduled") & ~ok) | (sched == "verify_miss")
    rows = []
    for p in np.unique(pid):
        m = pid == p
        ms = m & is_scan
        rows.append(
            {
                "partition_id": int(p),
                "scanned": int(ms.sum()),
                "scan_max_rowid": int(rowid[ms].max()) if ms.any() else -1,
                "err_gate": int(err_gate[m].sum()),
                "scheduled": int((m & (sched == "scheduled")).sum()),
                "fetched": int((m & ok).sum()),
                "deferred": int((m & (sched == "deferred")).sum()),
                "verified": int((m & ((sched == "verify_ok")
                                      | (sched == "verify_miss"))).sum()),
            }
        )
    return pa.Table.from_pylist(rows)


def run_pass(store: TableStore, cfg: CrawlConfig, state: CrawlState,
             robots_ref=None, handler=None) -> dict:
    """Execute one crawl pass; returns pass stats. Mutates *state* and
    commits it durably (meta.json last)."""
    t0 = time.monotonic()
    pass_id = state.pass_id + 1
    if robots_ref is None:
        robots_ref = ray.put(state.robots)
    if handler is None:
        handler = SimulatedFetchHandler(cfg.n_hosts, cfg.n_paths, cfg.fail_mod,
                                        cfg.parse_cost_bytes)
    seen_args = (state.seen.run_id, cfg.seen_shards, cfg.cuckoo_capacity,
                 cfg.bloom_bits)

    # ---- scan + retry union → bounded candidate set ----------------------
    frontier_files = store.fragments("frontier", committed_passes=state.pass_id)
    owned_parts = [
        p for p in range(cfg.num_partitions)
        if p % cfg.num_engines == cfg.engine_index
        and p not in cfg.skip_partitions
    ]
    wm_for_filter = dict(state.watermarks)
    for p in range(cfg.num_partitions):
        if p not in owned_parts:
            wm_for_filter[p] = 1 << 62  # excluded partitions scan nothing
    min_wm = min((state.watermarks[p] for p in owned_parts), default=-1)

    pieces = []
    if frontier_files:
        ds = ray.data.read_parquet(
            frontier_files, filter=pc.field("rowid") > pa.scalar(min_wm)
        )
        ds = ds.map_batches(
            make_watermark_filter(wm_for_filter, cfg.num_partitions),
            batch_format="pyarrow",
        )
        scan = ds.groupby("partition_id").map_groups(
            make_chunk_fn(cfg.items_chunk), batch_format="pyarrow"
        )
        pieces.append(scan.map_batches(_add_cand_cols("scan"),
                                       batch_format="pyarrow"))
    retry_tbl = store.read_fragment("retry", "retry", state.pass_id)
    n_dead = 0
    retry_live = _empty_retry()
    if retry_tbl is not None and len(retry_tbl):
        retry_live = retry_tbl.filter(
            pc.less(retry_tbl.column("attempts"), cfg.max_attempts))
        n_dead = len(retry_tbl) - len(retry_live)
        if n_dead:
            dead = retry_tbl.filter(
                pc.greater_equal(retry_tbl.column("attempts"), cfg.max_attempts))
            store.append_fragment("dead_letter", dead, pass_id, tag="dead")
        if len(retry_live):
            rds = ray.data.from_arrow(retry_live)
            pieces.append(rds.map_batches(_add_cand_cols("retry"),
                                          batch_format="pyarrow"))
    if not pieces:
        return _finalize_empty_pass(store, cfg, state, pass_id, t0, n_dead)
    cand = pieces[0]
    for p in pieces[1:]:
        cand = cand.union(p)
    cand = cand.materialize()
    n_cand = cand.count()
    if n_cand == 0:
        return _finalize_empty_pass(store, cfg, state, pass_id, t0, n_dead)

    # ---- tag → probe → politeness → mark → fetch -------------------------
    buckets_ref = ray.put(state.buckets)
    pipe = cand.map_batches(_make_owned_fn(cfg.num_nodes, cfg.node_id),
                            batch_format="pyarrow")
    # probe/mark are light (batched RPCs to the shard actors) — fractional
    # CPUs so the three pools of the pipeline never deadlock the node
    pipe = pipe.map_batches(
        SeenProbeStage, fn_constructor_args=seen_args,
        batch_format="pyarrow", concurrency=cfg.workers, num_cpus=0.25,
    )
    pipe = pipe.groupby("host").map_groups(
        make_schedule_fn(robots_ref, buckets_ref, cfg.pass_time_ms,
                         cfg.bucket_capacity_factor),
        batch_format="pandas",
    )
    pipe = pipe.map_batches(
        SeenMarkStage, fn_constructor_args=seen_args,
        batch_format="pyarrow", concurrency=cfg.workers, num_cpus=0.25,
    )
    result = pipe.map_batches(
        FetchStage, fn_constructor_args=(handler, cfg.bulk_process),
        batch_size=None if cfg.bulk_process else cfg.fetch_batch_size,
        batch_format="pyarrow", concurrency=cfg.workers,
    ).materialize()

    # ---- per-partition stats (partial agg → tiny shuffle) ----------------
    pstats = (
        result.map_batches(_partial_stats, batch_format="pyarrow")
        .groupby("partition_id")
        .aggregate(
            Sum("scanned", alias_name="scanned"),
            Max("scan_max_rowid", alias_name="scan_max_rowid"),
            Sum("err_gate", alias_name="err_gate"),
            Sum("scheduled", alias_name="scheduled"),
            Sum("fetched", alias_name="fetched"),
            Sum("deferred", alias_name="deferred"),
            Sum("verified", alias_name="verified"),
        )
        .to_pandas()
        .set_index("partition_id")
    )

    # ---- watermark gating (all-or-nothing per chunk) ---------------------
    advanced: set[int] = set()
    for p, row in pstats.iterrows():
        if row["scanned"] > 0 and row["err_gate"] == 0:
            state.watermarks[int(p)] = int(row["scan_max_rowid"])
            advanced.add(int(p))

    # ---- host bucket updates --------------------------------------------
    hstats = (
        result.groupby(["host", "sched"]).aggregate(Count(alias_name="n"))
        .to_pandas()
    )
    sched_by_host: dict[str, int] = {}
    for _, r in hstats.iterrows():
        if r["sched"] in _OWN_TAGS:
            sched_by_host.setdefault(r["host"], 0)
            if r["sched"] == "scheduled":
                sched_by_host[r["host"]] += int(r["n"])
    for host, m in sched_by_host.items():
        rb = state.robots.get(host)
        rules = rb["rules"] if rb else [{"allow": True, "path_prefix": "/"}]
        if rules and not rules[0]["allow"] and rules[0]["path_prefix"] == "/":
            continue  # skip-all hosts never touch their bucket
        delay = rb["crawl_delay_ms"] if rb else 1000
        rate = cfg.pass_time_ms / max(1.0, float(delay))
        cap = max(1.0, cfg.bucket_capacity_factor * rate)
        stored = state.buckets.get(host, cap)
        state.buckets[host] = min(cap, stored + rate) - m

    # ---- documents sink (streaming write, per-pass dir) ------------------
    docs = result.map_batches(
        lambda t: t.filter(t.column("ok")), batch_format="pyarrow"
    )
    doc_cols = docs.map_batches(
        lambda t: pa.table(
            {
                "doc_id": t.column("doc_id"),
                "url": t.column("canonical_url"),
                "host": t.column("host"),
                "pass_id": pa.array(np.full(len(t), pass_id, dtype=np.int64)),
                "spans": t.column("spans"),
            }
        ),
        batch_format="pyarrow",
    )
    n_fetched = int(pstats["fetched"].sum()) if len(pstats) else 0
    if n_fetched:
        doc_cols.write_parquet(store.pass_dir("documents", pass_id))

    # ---- link explosion → lineage + new frontier rows --------------------
    n_new_links = 0
    new_rows_ds = None
    if n_fetched:
        flat = (
            result.map_batches(lambda t: t.filter(t.column("ok")),
                               batch_format="pyarrow")
            .map_batches(explode_links, batch_format="pyarrow")
            .materialize()
        )
        if flat.count():
            lin = flat.map_batches(
                lambda t: pa.table(
                    {
                        "doc_id": t.column("parent_doc_id"),
                        "parent_url": t.column("parent_url"),
                        "url": t.column("url"),
                        "pass_id": pa.array(
                            np.full(len(t), pass_id, dtype=np.int64)),
                    },
                    schema=LINEAGE,
                ),
                batch_format="pyarrow",
            )
            lin.write_parquet(store.pass_dir("lineage", pass_id))
            enriched = flat.map_batches(
                make_link_enrich(cfg.num_partitions, cfg.salted_hosts),
                batch_format="pyarrow",
            )
            enriched = enriched.map_batches(
                SeenProbeStage, fn_constructor_args=seen_args,
                batch_format="pyarrow", concurrency=cfg.workers, num_cpus=0.25,
            ).map_batches(
                lambda t: t.filter(pc.invert(t.column("seen"))),
                batch_format="pyarrow",
            )
            deduped = enriched.groupby("canonical_url").aggregate(
                Min("depth", alias_name="depth")
            )
            new_rows_ds = deduped.map_batches(
                _relink_from_canonical(cfg), batch_format="pyarrow"
            )

    # ---- deferred re-queue (only for advanced partitions) ----------------
    adv = advanced
    def _deferred_filter(t: pa.Table) -> pa.Table:
        sched = np.asarray(t.column("sched").to_pylist())
        src = np.asarray(t.column("src").to_pylist())
        pid = t.column("partition_id").to_numpy()
        keep = (sched == "deferred") & (src == "scan") & np.isin(
            pid, np.fromiter(adv, dtype=np.int64, count=len(adv)))
        return t.filter(pa.array(keep))

    deferred_ds = None
    if advanced and int(pstats["deferred"].sum()) > 0:
        deferred_ds = result.map_batches(_deferred_filter,
                                         batch_format="pyarrow")
        deferred_ds = deferred_ds.map_batches(
            _to_append_shape(order_kind=0), batch_format="pyarrow")

    append_pieces = []
    if new_rows_ds is not None:
        append_pieces.append(
            new_rows_ds.map_batches(_to_append_shape(order_kind=1),
                                    batch_format="pyarrow"))
    if deferred_ds is not None:
        append_pieces.append(deferred_ds)
    if append_pieces:
        app = append_pieces[0]
        for x in append_pieces[1:]:
            app = app.union(x)
        assigned = app.groupby("partition_id").map_groups(
            make_rowid_assigner(dict(state.next_rowid), pass_id),
            batch_format="pyarrow",
        ).materialize()
        n_new_links = assigned.count()
        if n_new_links:
            counts = (
                assigned.groupby("partition_id")
                .aggregate(Count(alias_name="n")).to_pandas()
            )
            for _, r in counts.iterrows():
                p = int(r["partition_id"])
                state.next_rowid[p] = state.next_rowid.get(p, 0) + int(r["n"])
            frag_tbls = ray.get(assigned.to_arrow_refs())
            frag = pa.concat_tables([t.select([f.name for f in FRONTIER])
                                     for t in frag_tbls
                                     if t.num_columns and len(t)])
            store.append_fragment("frontier", frag, pass_id, tag="append",
                                  meta=_frontier_meta(frag))

    # ---- next retry table ------------------------------------------------
    def _retry_next(t: pa.Table) -> pa.Table:
        sched = np.asarray(t.column("sched").to_pylist())
        src = np.asarray(t.column("src").to_pylist())
        ok = t.column("ok").to_numpy()
        failed = (sched == "scheduled") & ~ok
        deferred_retry = (sched == "deferred") & (src == "retry")
        keep = failed | deferred_retry
        t2 = t.filter(pa.array(keep))
        failed2 = pa.array(
            (np.asarray(t2.column("sched").to_pylist()) == "scheduled"))
        att = t2.column("attempts").to_numpy().astype(np.int32)
        att = att + np.asarray(failed2).astype(np.int32)
        err = t2.column("error").to_pylist()
        last = t2.column("last_error").to_pylist()
        new_err = [e if f else l for e, f, l in
                   zip(err, np.asarray(failed2), last)]
        t2 = t2.drop_columns(["attempts", "last_error"])
        t2 = t2.append_column("attempts", pa.array(att))
        t2 = t2.append_column("last_error", pa.array(new_err, type=pa.string()))
        return t2.select([f.name for f in RETRY])

    retry_next_tbls = [
        t for t in ray.get(
            result.map_batches(_retry_next,
                               batch_format="pyarrow").to_arrow_refs())
        if t.num_columns and len(t)
    ]
    retry_next = (pa.concat_tables(retry_next_tbls) if retry_next_tbls
                  else _empty_retry())

    # ---- metrics ---------------------------------------------------------
    wall_ms = int((time.monotonic() - t0) * 1000)
    mrows = []
    for p, row in pstats.iterrows():
        mrows.append({"pass_id": pass_id, "partition_id": int(p),
                      "stage": "scan", "rows_in": int(row["scanned"]),
                      "rows_out": int(row["scheduled"]),
                      "errors": int(row["err_gate"]), "wall_ms": wall_ms})
        mrows.append({"pass_id": pass_id, "partition_id": int(p),
                      "stage": "fetch", "rows_in": int(row["scheduled"]),
                      "rows_out": int(row["fetched"]),
                      "errors": int(row["scheduled"] - row["fetched"]),
                      "wall_ms": wall_ms})
    metrics_tbl = pa.Table.from_pylist(mrows, schema=METRICS) if mrows \
        else pa.Table.from_pylist([], schema=METRICS)
    store.append_fragment("metrics", metrics_tbl, pass_id, tag="metrics")

    # ---- commit ----------------------------------------------------------
    state.pass_id = pass_id
    _write_state_fragments(store, cfg, state, retry_tbl=retry_next)
    store.write_meta({"pass_id": pass_id,
                      "num_partitions": cfg.num_partitions})
    n_sched = int(pstats["scheduled"].sum()) if len(pstats) else 0
    return {
        "pass_id": pass_id,
        "candidates": n_cand,
        "scanned": int(pstats["scanned"].sum()),
        "scheduled": n_sched,
        "fetched": n_fetched,
        "errors": int(pstats["err_gate"].sum()),
        "deferred": int(pstats["deferred"].sum()),
        "new_frontier_rows": n_new_links,
        "retry_size": len(retry_next),
        "dead": n_dead,
        "advanced_partitions": sorted(advanced),
        "wall_ms": wall_ms,
        "done": False,
    }


def _relink_from_canonical(cfg: CrawlConfig):
    """After the canonical_url dedup aggregate, rebuild the frontier row
    fields (url/host/hashes/priority/partition) from canonical_url."""
    salted = set(cfg.salted_hosts)

    def f(t: pa.Table) -> pa.Table:
        canon = t.column("canonical_url").to_pylist()
        hosts = [host_of(c) for c in canon]
        uh = hash64_many(canon)
        hh = hash64_many(hosts)
        P = np.uint64(cfg.num_partitions)
        pid = (hh % P).astype(np.int32)
        if salted:
            mask = np.array([h in salted for h in hosts])
            if mask.any():
                pid[mask] = (uh[mask] % P).astype(np.int32)
        prio = (uh % np.uint64(1000)).astype(np.float32) / 1000.0
        return pa.table(
            {
                "partition_id": pa.array(pid, type=pa.int32()),
                "url": pa.array(canon, type=pa.string()),
                "canonical_url": pa.array(canon, type=pa.string()),
                "host": pa.array(hosts, type=pa.string()),
                "url_hash": pa.array(uh, type=pa.uint64()),
                "host_hash": pa.array(hh, type=pa.uint64()),
                "priority": pa.array(prio, type=pa.float32()),
                "depth": t.column("depth").cast(pa.int32()),
            }
        )

    return f


def _to_append_shape(order_kind: int):
    """Normalize a branch to the pre-rowid append shape with deterministic
    ordering keys (deferred rows keep old-rowid order; links sort by URL)."""

    def f(t: pa.Table) -> pa.Table:
        n = len(t)
        cols = {
            "partition_id": t.column("partition_id").cast(pa.int32()),
            "url": t.column("url"),
            "canonical_url": t.column("canonical_url"),
            "host": t.column("host"),
            "url_hash": t.column("url_hash").cast(pa.uint64()),
            "host_hash": t.column("host_hash").cast(pa.uint64()),
            "priority": t.column("priority").cast(pa.float32()),
            "depth": t.column("depth").cast(pa.int32()),
            "order_kind": pa.array(np.full(n, order_kind, dtype=np.int8)),
            "order_a": (t.column("rowid").cast(pa.int64())
                        if "rowid" in t.column_names
                        else pa.array(np.zeros(n, dtype=np.int64))),
        }
        return pa.table(cols)

    return f


def _empty_retry() -> pa.Table:
    return pa.Table.from_pylist([], schema=RETRY)


def _finalize_empty_pass(store, cfg, state, pass_id, t0, n_dead=0) -> dict:
    state.pass_id = pass_id
    _write_state_fragments(store, cfg, state, retry_tbl=_empty_retry())
    store.write_meta({"pass_id": pass_id, "num_partitions": cfg.num_partitions})
    return {"pass_id": pass_id, "candidates": 0, "scanned": 0, "scheduled": 0,
            "fetched": 0, "errors": 0, "deferred": 0, "new_frontier_rows": 0,
            "retry_size": 0, "dead": n_dead, "advanced_partitions": [],
            "wall_ms": int((time.monotonic() - t0) * 1000), "done": True}


# --------------------------------------------------------------------- loop
def run_crawl(root: str, cfg: CrawlConfig, seed_urls: list[str] | None = None,
              max_passes: int | None = None, resume: bool = False,
              handler=None, teardown: bool = True) -> dict:
    """The run_always analog: pass loop until frontier exhaustion or the
    pass budget. Kill-safe at any point; re-run with resume=True."""
    if resume:
        store, state = resume_run(root, cfg)
    else:
        assert seed_urls is not None, "fresh run needs seed_urls"
        store, state = init_run(root, cfg, seed_urls)
    robots_ref = ray.put(state.robots)
    passes = []
    budget = max_passes if max_passes is not None else cfg.max_passes
    try:
        while state.pass_id < budget:
            stats = run_pass(store, cfg, state, robots_ref=robots_ref,
                             handler=handler)
            passes.append(stats)
            if stats["done"] and stats["retry_size"] == 0:
                break
    finally:
        if teardown:
            state.seen.teardown()
    return {
        "passes": passes,
        "total_fetched": sum(p["fetched"] for p in passes),
        "total_scheduled": sum(p["scheduled"] for p in passes),
        "final_pass": state.pass_id,
    }
