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
      → map_batches(watermark WINDOW filter, vectorized)       [S1/O3]
        (= sort+head(chunk), shuffle-free: per-partition rowids are dense)
      → union(retry re-injections)                                [J3]
      → map_batches(mod-ownership tag)                            [M1]
      → map_batches(seen probe, per-worker cached shard clients)  [J1]
      → groupby(host_hash).map_groups(politeness/robots/top-k) [O1/T6/J2/M5]
        (the ONE per-pass shuffle — the priority-frontier exchange)
      → mark-WAL append + bulk seen mark (scheduled scan rows;
        write-ahead-logged so a mid-pass kill rolls back exactly)   [T5]
      → map_batches(fetch: actor pool or elastic tasks)      [T1/M2/M3]
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

from ..config import CrawlConfig
from ..functions.canonicalize import canonicalize_many, host_of
from ..functions.hashing import hash64_many
from ..schemas import BUCKETS, CHECKPOINTS, FRONTIER, LINEAGE, METRICS, RETRY
from ..sources import synth
from ..stages.fetch import FetchStage, SimulatedFetchHandler
from ..stages.links import explode_links, make_link_enrich, make_rowid_assigner
from ..stages.politeness import make_schedule_fn
from ..stages.probe import make_probe_fn
from ..stages.scan import make_watermark_filter
from ..state.seen import SeenSet
from ..storage import TableStore

CAND_COLS = [f.name for f in RETRY] + ["src"]

_LOG = __import__("logging").getLogger("container_crawler_ray.crawl")

# mark-WAL retention (passes per engine). The rollback guard reads other
# engines' retained WALs to avoid erasing a foreign dup-mark (auto-salt
# transient disagreement); a torn pass can only temporally overlap a
# foreign pass within a few pass-walls of the commit frontier, so a
# small window suffices — and bounds the on-disk WAL footprint that
# previously grew without bound.
_MARK_WAL_KEEP = 4


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
    # multi-engine: per-sender high-water of drained link-mailbox passes
    drained: dict = field(default_factory=dict)


def _etag(cfg: CrawlConfig, base: str) -> str:
    """Per-engine state-fragment tag. Multi-engine runs are shared-nothing
    (the reference's one-daemon-per-node model): each engine owns the
    partitions with ``partition_id % num_engines == engine_index`` and its
    own watermark/retry/bucket state under a suffixed tag."""
    return f"{base}-e{cfg.engine_index}" if cfg.num_engines > 1 else base


def _meta_name(cfg: CrawlConfig) -> str:
    return (f"meta-e{cfg.engine_index}.json" if cfg.num_engines > 1
            else "meta.json")


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
    # persist robots so resume (any engine, any process) sees the same
    # politeness rules that were configured at init
    hosts = sorted(state.robots)
    store.write_current("robots", pa.table(
        {
            "host": hosts,
            "crawl_delay_ms": pa.array(
                [state.robots[h]["crawl_delay_ms"] for h in hosts],
                type=pa.int32()),
            "rules": [state.robots[h]["rules"] for h in hosts],
        }))
    single = dataclasses_replace_single(cfg)
    _write_state_fragments(store, single, state)
    # seen_run_id in the init meta lets every engine of a multi-engine run
    # resolve the SAME named shard actors — the seen set is cluster-global,
    # sharded by url_hash, exactly as on a real multi-node cluster
    store.write_meta({"pass_id": 0, "run": "initialized",
                      "num_partitions": cfg.num_partitions,
                      "salted_hosts": list(cfg.salted_hosts),
                      "seen_run_id": state.seen.run_id})
    # sidecar survives pass commits (which overwrite meta.json in
    # single-engine mode): destroy_run_actors reads it to reclaim the
    # run's detached shard actors after a crash without a resume
    store.write_meta({"seen_run_id": state.seen.run_id},
                     name="seen_run.json")
    return store, state


def dataclasses_replace_single(cfg: CrawlConfig) -> CrawlConfig:
    """Coordinator view of the config (init writes the plain/global state)."""
    import dataclasses
    if cfg.num_engines == 1:
        return cfg
    return dataclasses.replace(cfg, num_engines=1, engine_index=0)


def resume_run(root: str, cfg: CrawlConfig) -> tuple[TableStore, CrawlState]:
    """Exact resume from the last committed pass: every state table is read
    at the meta version; later (torn) fragments are ignored and will be
    overwritten when the pass re-runs. A multi-engine engine's first start
    bootstraps from the coordinator's init state (plain meta/ckpt)."""
    store = TableStore(root)
    init_meta = store.read_meta()
    assert init_meta is not None, "no meta.json — nothing to resume"
    # partitioning is part of the durable layout: resuming with a different
    # partition count would silently skip partitions / mis-route links
    init_parts = init_meta.get("num_partitions")
    assert init_parts is None or init_parts == cfg.num_partitions, (
        f"resume with num_partitions={cfg.num_partitions} but the run was "
        f"initialized with {init_parts}")
    meta = store.read_meta(_meta_name(cfg)) if cfg.num_engines > 1 else init_meta
    bootstrap = meta is None
    if bootstrap:
        meta = init_meta  # engine's first start: coordinator state at pass 0
    p = meta["pass_id"]
    ck = store.read_fragment("checkpoints",
                             "ckpt" if bootstrap else _etag(cfg, "ckpt"), p)
    # single-engine pass commits overwrite meta.json, dropping
    # seen_run_id — resume then mints FRESH shard names on purpose:
    # reusing the old names would race a just-torn-down actor set
    # (kill + get_if_exists on the same name). The sidecar below tracks
    # whichever name set is CURRENT so destroy_run_actors can reclaim it.
    seen_run = init_meta.get("seen_run_id", uuid.uuid4().hex[:12])
    rb_tbl = store.read_current("robots")
    robots = (
        {r["host"]: {"crawl_delay_ms": r["crawl_delay_ms"],
                     "rules": r["rules"]}
         for r in rb_tbl.to_pylist()}
        if rb_tbl is not None else synth.robots_lookup(cfg.n_hosts)
    )
    state = CrawlState(
        run_id=uuid.uuid4().hex[:12],
        pass_id=p if not bootstrap else 0,
        watermarks={}, next_rowid={}, buckets={},
        robots=robots,
        seen=SeenSet(seen_run, cfg.seen_shards,
                     cfg.cuckoo_capacity, cfg.bloom_bits),
        # salting is part of the durable partition layout — the committed
        # meta (init-time config plus any auto-salted hosts detected
        # mid-crawl) wins over whatever the resume-time cfg happens to say
        salted_hosts=tuple(meta.get(
            "salted_hosts",
            init_meta.get("salted_hosts", cfg.salted_hosts))),
        drained=dict((int(k), v) for k, v in
                     (meta.get("drained") or {}).items()),
    )
    own = (lambda q: q % cfg.num_engines == cfg.engine_index)
    for row in ck.to_pylist():
        if cfg.num_engines > 1 and not own(row["partition_id"]):
            continue
        state.watermarks[row["partition_id"]] = row["last_row"]
        state.next_rowid[row["partition_id"]] = row["next_rowid"]
    bk = store.read_fragment("buckets",
                             "buckets" if bootstrap else _etag(cfg, "buckets"), p)
    if bk is not None:
        state.buckets = dict(zip(bk.column("host").to_pylist(),
                                 bk.column("tokens").to_pylist()))
    # seen restore: single-engine restores its snapshot unconditionally
    # (its torn-pass marks must roll back to the commit point, and no
    # other engine's marks can be erased). Multi-engine shards are
    # SHARED mutable state: restoring any LIVE shard from a snapshot
    # would erase marks other engines added after it was taken (their
    # committed docs would then re-fetch as duplicates). So snapshots
    # only ever hydrate FRESH shard actors (num_items == 0 — node loss /
    # first start), each from its owner engine's last committed
    # fragment; a resuming engine's own uncommitted marks are instead
    # rolled back SURGICALLY from its mark-WAL (below).
    if cfg.num_engines == 1:
        sn = store.read_fragment("seen_shards", "seen", p)
        if sn is not None and len(sn):
            state.seen.restore_from_table(sn)
    else:
        items = state.seen.items_per_shard()
        for e in range(cfg.num_engines):
            m_e = store.read_meta(f"meta-e{e}.json")
            if m_e is None:
                continue
            sn = store.read_fragment("seen_shards", f"seen-e{e}",
                                     m_e["pass_id"])
            if sn is not None and len(sn):
                ok = {s for s in range(cfg.seen_shards)
                      if s % cfg.num_engines == e and items[s] == 0}
                state.seen.restore_from_table(sn, only_shards=ok)
        # torn-pass mark rollback: if this engine crashed MID-PASS, the
        # marks it applied for the uncommitted pass were write-ahead-
        # logged (run_pass writes the "marks" WAL before any
        # contains_add). Delete them from ALL shards — live ones hold
        # the torn marks directly; freshly-restored foreign snapshots
        # may also contain them (a foreign commit can postdate the torn
        # marks).
        #
        # AUTO-SALT INTERACTION: partition ownership *almost* guarantees
        # no other engine marks these URLs — the exception is a host
        # whose salted status the engines transiently disagree on (see
        # the auto-salt comment at the frontier-append site): the same
        # discovered URL can then land in two partitions owned by two
        # engines, both of which schedule+mark it. An unconditional
        # rollback would erase the survivor's legitimate mark (possibly
        # backing a committed document) and re-permit a duplicate
        # fetch. Guard: intersect the torn WAL against every OTHER
        # engine's retained mark-WAL fragments (their last
        # ``_MARK_WAL_KEEP`` committed passes plus any in-flight pass) —
        # a hash another engine has write-ahead-logged is one it marked
        # (or is about to mark and will either commit or roll back
        # itself), so we leave it in place. Residual hazards, accepted
        # and logged: (1) a hash that overflowed into a shard's bloom
        # spill tier during the torn window cannot be deleted
        # (``residual`` count); (2) a cuckoo fingerprint collision can
        # delete an unrelated key on a shard where the WAL hash is
        # absent (bounded by the per-shard FPR, and only on crash
        # paths); (3) a foreign dup-mark older than the WAL retention
        # window is not protected (the window covers every pass that
        # can temporally overlap the torn one).
        wal = store.read_fragment("marks", _etag(cfg, "marks"),
                                  state.pass_id + 1)
        if wal is not None and len(wal):
            torn = wal.column("url_hash").to_numpy().astype(np.uint64)
            foreign: list[np.ndarray] = []
            for e in range(cfg.num_engines):
                if e == cfg.engine_index:
                    continue
                # scan EVERY retained fragment of this foreign engine,
                # not just its last _MARK_WAL_KEEP passes: GC retention
                # is pinned by the min commit frontier across engines
                # (see _write_state_fragments), so after a long stall the
                # protecting fragment can be far older than the foreign
                # engine's own recent window — and an in-flight pass WAL
                # (pass_id+1) is also in the listing.
                for q in store.list_fragment_passes(
                        "marks", f"marks-e{e}"):
                    fw = store.read_fragment("marks", f"marks-e{e}", q)
                    if fw is not None and len(fw):
                        foreign.append(
                            fw.column("url_hash").to_numpy()
                            .astype(np.uint64))
            if foreign:
                prot = np.isin(torn, np.concatenate(foreign))
                n_prot = int(prot.sum())
                torn = torn[~prot]
            else:
                n_prot = 0
            removed, residual = state.seen.remove(torn)
            _LOG.info(
                "torn-pass mark rollback (engine %d, pass %d): "
                "%d WAL hashes, %d removed, %d bloom-residual, "
                "%d protected by foreign mark-WALs",
                cfg.engine_index, state.pass_id + 1,
                len(torn) + n_prot, removed, residual, n_prot)
        # the WAL is consumed: remove it so a second crash during the
        # re-run of this pass cannot roll the same marks back twice
        # (the re-run rewrites its own fresh WAL before marking)
        store.remove_fragment("marks", _etag(cfg, "marks"),
                              state.pass_id + 1)
    # track the CURRENT shard-actor name set for crash cleanup
    store.write_meta({"seen_run_id": state.seen.run_id},
                     name="seen_run.json")
    return store, state


def _frontier_meta(t: pa.Table) -> dict:
    """Sidecar manifest for scan pruning: global + per-partition max rowid."""
    if len(t) == 0:
        return {"max_rowid": -1, "per_partition_max": {}}
    pid = t.column("partition_id").to_numpy()
    rowid = t.column("rowid").to_numpy()
    per = {}
    for p in np.unique(pid):
        per[str(int(p))] = int(rowid[pid == p].max())
    return {"max_rowid": int(rowid.max()), "per_partition_max": per}


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
    store.append_fragment("checkpoints", ck, p, tag=_etag(cfg, "ckpt"))
    hosts = sorted(state.buckets)
    bk = pa.table(
        {"host": hosts,
         "tokens": pa.array([state.buckets[h] for h in hosts], type=pa.float64())},
        schema=BUCKETS,
    )
    store.append_fragment("buckets", bk, p, tag=_etag(cfg, "buckets"))
    # multi-engine: each engine checkpoints the seen shards it owns
    # (shard % E == engine) so no engine overwrites another's marks
    shard_ids = None
    if cfg.num_engines > 1:
        shard_ids = [s for s in range(cfg.seen_shards)
                     if s % cfg.num_engines == cfg.engine_index]
    store.append_fragment("seen_shards", state.seen.snapshot_table(shard_ids),
                          p, tag=_etag(cfg, "seen"))
    if retry_tbl is not None:
        store.append_fragment("retry", retry_tbl, p, tag=_etag(cfg, "retry"))
    for name, tag in (("checkpoints", _etag(cfg, "ckpt")),
                      ("buckets", _etag(cfg, "buckets")),
                      ("seen_shards", _etag(cfg, "seen")),
                      ("retry", _etag(cfg, "retry"))):
        store.gc_state_fragments(name, tag, p - 1)
    # mark-WALs keep a _MARK_WAL_KEEP-pass window BEHIND THE MINIMUM
    # COMMIT FRONTIER ACROSS ALL ENGINES, not behind this engine's own
    # pass: a crashed engine resumes arbitrarily later, and its torn-pass
    # rollback must still find any foreign dup-mark WAL (auto-salt
    # disagreement) that overlapped its torn pass. GC'ing at our own
    # `p - KEEP` could erase that fragment once we outrun the crashed
    # engine by >KEEP passes, so a stalled engine pins retention until it
    # resumes. The 'temporal overlap' bound holds at ROLLBACK time only
    # when anchored to the slowest engine.
    if cfg.num_engines > 1:
        frontier = p
        for e in range(cfg.num_engines):
            if e == cfg.engine_index:
                continue
            m_e = store.read_meta(f"meta-e{e}.json")
            frontier = min(frontier,
                           m_e["pass_id"] if m_e is not None else -1)
    else:
        frontier = p
    store.gc_state_fragments("marks", _etag(cfg, "marks"),
                             frontier - _MARK_WAL_KEEP)


def _purge_torn_pass(store: TableStore, cfg: CrawlConfig,
                     pass_id: int) -> None:
    """Remove orphan fragments a crashed attempt at THIS (uncommitted)
    pass may have left behind. Unconditional writes (checkpoints, buckets,
    seen snapshots, metrics) are overwritten by the re-run, but the
    CONDITIONAL ones — frontier append, retry, dead-letter, docs/lineage
    pass dirs, mailboxes — are only written when non-empty; if the re-run
    produces nothing for one of them, the torn fragment would survive and
    be read back as committed data once this pass's meta lands (e.g. a
    garbage ``append_0000NN.parquet`` crashes the NEXT pass's scan).
    Only this engine's own tags are touched; shared-name tags (dead,
    metrics) are purged in single-engine mode only."""
    store.remove_fragment("frontier", _etag(cfg, "append"), pass_id)
    store.remove_fragment("retry", _etag(cfg, "retry"), pass_id)
    store.remove_pass_dir("documents", pass_id, tag=_etag(cfg, "pass"))
    store.remove_pass_dir("lineage", pass_id, tag=_etag(cfg, "pass"))
    if cfg.num_engines == 1:
        store.remove_fragment("dead_letter", "dead", pass_id)
        store.remove_fragment("metrics", "metrics", pass_id)
    else:
        store.remove_fragment(
            "frontier", f"append-e{cfg.engine_index}d", pass_id)
        for tgt in range(cfg.num_engines):
            if tgt != cfg.engine_index:
                store.remove_fragment(
                    "mailbox",
                    f"inbox-e{tgt}-from-e{cfg.engine_index}", pass_id)


# ------------------------------------------------------------ multi-engine
def _committed_frontier_files(store: TableStore, cfg: CrawlConfig,
                              state: CrawlState) -> list[str]:
    """Multi-engine frontier visibility: the seed fragments (coordinator,
    committed by the plain init meta) plus THIS engine's own committed
    appends. Foreign engines never append to the shared frontier — they
    post link intents to per-engine mailboxes instead — so cross-engine
    rowid sequences cannot collide."""
    import os as _os

    from ..storage import fragment_pass_id

    files = store.fragments("frontier")
    mine = (f"append-e{cfg.engine_index}_", f"append-e{cfg.engine_index}d_")
    out = []
    for f in files:
        base = _os.path.basename(f)
        p = fragment_pass_id(base)
        if p is None:
            continue
        if base.startswith(mine):
            if p <= state.pass_id:
                out.append(f)
        elif base.startswith("append_"):  # coordinator seed fragment
            out.append(f)
    return out


def _drain_mailboxes(store: TableStore, cfg: CrawlConfig, state: CrawlState,
                     pass_id: int) -> int:
    """Pick up committed link intents addressed to this engine, assign
    rowids from this engine's per-partition counters (deterministic order:
    sender, sender-pass, canonical_url) and append them to the frontier so
    this very pass can scan them. The mailbox high-water per sender is part
    of this engine's meta commit, so a killed pass re-drains identically.
    """
    import pyarrow.parquet as pq

    rows: list[pa.Table] = []
    new_drained = dict(state.drained)
    for e in range(cfg.num_engines):
        if e == cfg.engine_index:
            continue
        m_e = store.read_meta(f"meta-e{e}.json")
        committed = m_e["pass_id"] if m_e else -1
        lo = new_drained.get(e, 0)
        for sp in range(lo + 1, committed + 1):
            t = store.read_fragment("mailbox",
                                    f"inbox-e{cfg.engine_index}-from-e{e}", sp)
            if t is not None and len(t):
                t = t.sort_by("canonical_url")
                rows.append(t)
        if committed > lo:
            new_drained[e] = committed
    state.drained = new_drained
    if not rows:
        return 0
    tbl = pa.concat_tables(rows)
    tbl = assign_seed_rowids(tbl.select([
        "partition_id", "url", "canonical_url", "host", "url_hash",
        "host_hash", "priority", "depth"]), state.next_rowid,
        pass_id=pass_id)
    store.append_fragment("frontier", tbl, pass_id,
                          tag=f"append-e{cfg.engine_index}d",
                          meta=_frontier_meta(tbl))
    return len(tbl)


def _prune_consumed_fragments(store: TableStore, files: list[str],
                              watermarks: dict[int, int]) -> list[str]:
    """Manifest-level fragment pruning (S1 scale path, SURVEY.md §2.1):
    a fragment whose sidecar ``max_rowid`` is ≤ the minimum watermark over
    all partitions can contain no unscanned row — skip it before any I/O.
    Conservative: fragments without sidecars are kept. At 10^10-URL scale
    this is what keeps pass cost proportional to the frontier DELTA, not
    the frontier's lifetime size."""
    out = []
    for f in files:
        m = store.fragment_meta(f)
        if m is not None:
            per = m.get("per_partition_max")
            if per is not None:
                if all(int(mx) <= watermarks.get(int(p), -1)
                       for p, mx in per.items()):
                    continue
            elif (watermarks and m.get("max_rowid", 1 << 62)
                    <= min(watermarks.values())):
                continue
        out.append(f)
    return out


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


def run_pass(store: TableStore, cfg: CrawlConfig, state: CrawlState,
             robots_ref=None, handler=None) -> dict:
    """Execute one crawl pass; returns pass stats. Mutates *state* and
    commits it durably (meta.json last)."""
    t0 = time.monotonic()
    _tm: dict[str, float] = {}
    _last = [t0]

    def _mark(name: str) -> None:
        now = time.monotonic()
        _tm[name] = round(now - _last[0], 3)
        _last[0] = now

    pass_id = state.pass_id + 1
    _purge_torn_pass(store, cfg, pass_id)
    if robots_ref is None:
        robots_ref = ray.put(state.robots)
    if handler is None:
        handler = SimulatedFetchHandler(cfg.n_hosts, cfg.n_paths, cfg.fail_mod,
                                        cfg.parse_cost_bytes)
    seen_args = (state.seen.run_id, cfg.seen_shards, cfg.cuckoo_capacity,
                 cfg.bloom_bits)

    # ---- scan + retry union → bounded candidate set ----------------------
    if cfg.num_engines > 1:
        _drain_mailboxes(store, cfg, state, pass_id)
        frontier_files = _committed_frontier_files(store, cfg, state)
        # include this pass's own freshly-drained fragment
        frontier_files += [
            f for f in store.fragments("frontier")
            if f"append-e{cfg.engine_index}d_{pass_id:06d}" in f
        ]
    else:
        frontier_files = store.fragments("frontier",
                                         committed_passes=state.pass_id)
    frontier_files = _prune_consumed_fragments(store, frontier_files,
                                               state.watermarks)
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
        # backend-pluggable distributed scan with rowid predicate pushdown
        ds = store.ray_read(frontier_files,
                            filter=pc.field("rowid") > pa.scalar(min_wm))
        # window filter = sort-by-rowid + head(items_chunk), shuffle-free
        # (per-partition rowids are dense — see make_watermark_filter)
        scan = ds.map_batches(
            make_watermark_filter(wm_for_filter, cfg.num_partitions,
                                  cfg.items_chunk),
            batch_format="pyarrow",
        )
        pieces.append(scan.map_batches(_add_cand_cols("scan"),
                                       batch_format="pyarrow"))
    retry_tbl = store.read_fragment("retry", _etag(cfg, "retry"),
                                    state.pass_id)
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
    _mark("scan")
    if n_cand == 0:
        return _finalize_empty_pass(store, cfg, state, pass_id, t0, n_dead)

    # ---- tag → probe → politeness → mark-WAL → mark → fetch --------------
    buckets_ref = ray.put(state.buckets)
    pipe = cand.map_batches(_make_owned_fn(cfg.num_nodes, cfg.node_id),
                            batch_format="pyarrow")
    # probe is a plain task function with a per-worker-process client
    # cache (stages/probe.py): Ray's long-lived workers amortize the
    # named-actor lookups across passes, with no per-pass pool spin-up
    pipe = pipe.map_batches(make_probe_fn(seen_args), batch_format="pyarrow")
    pipe = pipe.groupby("host_hash").map_groups(
        make_schedule_fn(robots_ref, buckets_ref, cfg.pass_time_ms,
                         cfg.bucket_capacity_factor),
        batch_format="pyarrow",
    )
    # Seen marks are WRITE-AHEAD-LOGGED then bulk-applied from the driver
    # — not an inline pipeline stage. The politeness groupby is already a
    # barrier and the scheduled set is bounded (P×items_chunk+|retry|),
    # so the extra materialize is cheap; in exchange, a crash at ANY
    # point after the first mark leaves a durable record of exactly
    # which hashes were (about to be) marked, and the resume path
    # deletes exactly them from the shared shards — closing the old
    # caveat where a mid-pass engine crash left uncommitted marks on
    # shared shards and its replayed rows were dropped as "seen" (lost
    # docs). Bulk driver apply also removes per-batch shard RPCs from
    # the fetch path. WAL-then-mark runs on a DRIVER THREAD overlapped
    # with the fetch stage: nothing in the fetch path reads the seen
    # set, and the one consumer that does (the discovered-link probe in
    # the flat branch) only starts after the fetch materialize, by
    # which point the thread has been joined. The WAL write strictly
    # precedes the first contains_add inside the thread, preserving the
    # crash invariant.
    pipe = pipe.materialize()

    def _wal_and_mark():
        sched_hashes = np.concatenate([
            b.column("url_hash").to_numpy().astype(np.uint64)[
                (pc.equal(b.column("sched"), "scheduled").to_numpy(
                    zero_copy_only=False))
                & (pc.equal(b.column("src"), "scan").to_numpy(
                    zero_copy_only=False))]
            for b in pipe.iter_batches(batch_format="pyarrow",
                                       batch_size=None)] or
            [np.zeros(0, dtype=np.uint64)])
        store.append_fragment(
            "marks", pa.table({"url_hash": pa.array(sched_hashes)}),
            pass_id, tag=_etag(cfg, "marks"))
        state.seen.contains_add(sched_hashes)

    from concurrent.futures import ThreadPoolExecutor as _TPE
    _mark_pool = _TPE(max_workers=1)
    mark_fut = _mark_pool.submit(_wal_and_mark)
    # Even out the post-shuffle blocks before fetch: the politeness groupby
    # emits one block per host group, so a hot host (Zipf head) would ride
    # into fetch as ONE straggler task. repartition splits the bounded
    # candidate set into uniform blocks and breaks operator fusion with the
    # group tasks — this is the explicit hot-host skew handling for the
    # fetch stage (SURVEY.md §4.1). Block count adapts to the candidate
    # count: fetch task granularity IS block granularity, and coarse blocks
    # quantize the stage into straggler-sensitive waves.
    n_blocks = int(np.clip(n_cand // 400, cfg.workers * 2, 1024))
    pipe = pipe.repartition(n_blocks)
    fetch_kwargs = dict(
        batch_size=None if cfg.bulk_process else cfg.fetch_batch_size,
        batch_format="pyarrow",
    )
    if cfg.fetch_mode == "tasks":
        # elastic stateless tasks + per-worker handler cache
        from ..stages.fetch import make_fetch_fn
        handler_ref = ray.put(handler)
        result = pipe.map_batches(
            make_fetch_fn(handler_ref, cfg.bulk_process), **fetch_kwargs
        ).materialize()
    else:
        # actor pool (autoscaling 1..workers so upstream stages never starve)
        result = pipe.map_batches(
            FetchStage, fn_constructor_args=(handler, cfg.bulk_process),
            concurrency=(1, cfg.workers), **fetch_kwargs,
        ).materialize()
    # marks must be durable + applied before anything probes the seen
    # set (the link branch below); in practice the thread finished long
    # before the fetch did
    mark_fut.result()
    _mark_pool.shutdown()
    _mark("probe_sched_fetch")

    # ---- three independent consumers of the materialized result run
    # CONCURRENTLY (separate Dataset executions on driver threads):
    #   A. documents sink (streaming parquet write)
    #   B. link explosion (+ lineage write) — feeds the frontier append
    #   C. slim driver-side collection for all small derivations
    # Everything except the heavy payload columns (spans/links) comes back
    # in one execution; candidates are bounded by P×items_chunk+|retry|
    # (the reference's micro-batch invariant), so C is a bounded,
    # vectorized driver step — not a driver loop over the dataset.
    from concurrent.futures import ThreadPoolExecutor

    def _docs_branch():
        docs = result.map_batches(
            lambda t: t.filter(t.column("ok")), batch_format="pyarrow")
        doc_cols = docs.map_batches(
            lambda t: pa.table(
                {
                    "doc_id": t.column("doc_id"),
                    "url": t.column("canonical_url"),
                    "host": t.column("host"),
                    "pass_id": pa.array(
                        np.full(len(t), pass_id, dtype=np.int64)),
                    "spans": t.column("spans"),
                }
            ),
            batch_format="pyarrow",
        )
        doc_cols.write_parquet(store.pass_dir("documents", pass_id,
                                              tag=_etag(cfg, "pass")))

    def _flat_branch():
        # explode + canonicalize/hash/route in ONE execution, overlapped
        # with the driver's slim processing; the seen-probe stays lazy on
        # the append path so lineage records every extracted edge
        return (
            result.map_batches(lambda t: t.filter(t.column("ok")),
                               batch_format="pyarrow")
            .map_batches(explode_links, batch_format="pyarrow")
            # coalesce: downstream probe does one RPC per shard per BLOCK,
            # so fewer, larger blocks keep the shard actors off the
            # critical path
            .repartition(max(cfg.workers, 8))
            .map_batches(
                make_link_enrich(cfg.num_partitions, state.salted_hosts,
                                 keep_parents=True),
                batch_format="pyarrow")
            .materialize()
        )

    def _lineage_branch(flat):
        # runs concurrently with the driver's frontier-append assembly —
        # both consume the already-materialized flat blocks
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
            lin.write_parquet(store.pass_dir("lineage", pass_id,
                                             tag=_etag(cfg, "pass")))

    pool = ThreadPoolExecutor(max_workers=3)
    docs_fut = pool.submit(_docs_branch)
    flat_fut = pool.submit(_flat_branch)
    # zero-copy read of the already-materialized blocks (no extra Ray
    # execution); drop the payload columns before the pandas conversion
    _slim_tbls = [t for t in ray.get(result.to_arrow_refs())
                  if t.num_columns and len(t)]
    slim = (pa.concat_tables(_slim_tbls)
            .drop_columns(["spans", "links"]).to_pandas())
    _mark("slim_collect")
    is_scan = (slim["src"] == "scan").to_numpy()
    sched_a = slim["sched"].to_numpy()
    ok_a = slim["ok"].to_numpy()
    pid_a = slim["partition_id"].to_numpy()
    rowid_a = slim["rowid"].to_numpy()
    err_gate_m = ((is_scan & (sched_a == "scheduled") & ~ok_a)
                  | (sched_a == "verify_miss"))
    flags = pd.DataFrame({
        "partition_id": pid_a,
        "scanned": is_scan.astype(np.int64),
        "scan_rowid": np.where(is_scan, rowid_a, -1),
        "err_gate": err_gate_m.astype(np.int64),
        "scheduled": (sched_a == "scheduled").astype(np.int64),
        "fetched": ok_a.astype(np.int64),
        "deferred": (sched_a == "deferred").astype(np.int64),
        "verified": np.isin(sched_a, ("verify_ok", "verify_miss")).astype(
            np.int64),
    })
    pstats = flags.groupby("partition_id").agg(
        scanned=("scanned", "sum"), scan_max_rowid=("scan_rowid", "max"),
        err_gate=("err_gate", "sum"), scheduled=("scheduled", "sum"),
        fetched=("fetched", "sum"), deferred=("deferred", "sum"),
        verified=("verified", "sum"))

    # ---- watermark gating (all-or-nothing per chunk) ---------------------
    advanced: set[int] = set()
    for p, row in pstats.iterrows():
        if row["scanned"] > 0 and row["err_gate"] == 0:
            state.watermarks[int(p)] = int(row["scan_max_rowid"])
            advanced.add(int(p))

    # ---- host bucket updates --------------------------------------------
    own_m = np.isin(sched_a, _OWN_TAGS)
    sched_counts = (slim.loc[own_m]
                    .assign(s=(sched_a[own_m] == "scheduled").astype(np.int64))
                    .groupby("host")["s"].sum())
    from ..stages.politeness import _allowed as _robots_allowed
    for host, m in sched_counts.items():
        rb = state.robots.get(host)
        rules = rb["rules"] if rb else [{"allow": True, "path_prefix": "/"}]
        if not _robots_allowed(rules, "/"):
            continue  # skip-all hosts never touch their bucket (same
            # first-match predicate as the scheduler — no drift)
        delay = rb["crawl_delay_ms"] if rb else 1000
        rate = cfg.pass_time_ms / max(1.0, float(delay))
        cap = max(1.0, cfg.bucket_capacity_factor * rate)
        stored = state.buckets.get(host, cap)
        nb = min(cap, stored + rate) - int(m)
        # bound driver memory to hosts with outstanding debt: an entry
        # that would refill to capacity next pass (nb + rate >= cap)
        # behaves exactly like an absent entry (avail = cap either way),
        # so drop it — at 10^8 hosts the dict holds only the recently
        # throttled head, not every host ever scheduled
        if nb + rate >= cap:
            state.buckets.pop(host, None)
        else:
            state.buckets[host] = nb

    # ---- join the link branch (docs sink keeps writing concurrently —
    # it is only joined right before the commit point below) ---------------
    n_fetched = int(pstats["fetched"].sum()) if len(pstats) else 0
    flat = flat_fut.result()
    lineage_fut = pool.submit(_lineage_branch, flat)
    n_new_links = 0
    new_rows_ds = None
    if flat.count():
        # exact per-pass link dedup happens inside the partition
        # assigner (equal URLs co-locate by construction), so the only
        # shuffle left on this path is the partition groupby itself
        new_rows_ds = flat.map_batches(
            make_probe_fn(seen_args), batch_format="pyarrow"
        ).map_batches(
            lambda t: t.filter(pc.invert(t.column("seen"))).drop_columns(
                ["seen", "parent_url", "parent_doc_id"]),
            batch_format="pyarrow",
        )
    _mark("links")

    # ---- deferred re-queue (only for advanced partitions) ----------------
    deferred_m = ((sched_a == "deferred") & is_scan
                  & np.isin(pid_a, np.fromiter(advanced, dtype=np.int64,
                                               count=len(advanced))))
    append_pieces = []
    if deferred_m.any():
        dslim = slim.loc[deferred_m]
        append_pieces.append(ray.data.from_arrow(
            _append_shape_from_pandas(dslim, order_kind=0)))
    if new_rows_ds is not None:
        if cfg.num_engines > 1:
            # foreign-partition links are POSTED, not appended: only the
            # owning engine may assign rowids in its partitions
            E, me = cfg.num_engines, cfg.engine_index

            def _own_filter(t: pa.Table) -> pa.Table:
                pid = t.column("partition_id").to_numpy()
                return t.filter(pa.array(pid % E == me))

            def _foreign_filter(t: pa.Table) -> pa.Table:
                pid = t.column("partition_id").to_numpy()
                return t.filter(pa.array(pid % E != me))

            foreign_tbls = [
                t for t in ray.get(
                    new_rows_ds.map_batches(_foreign_filter,
                                            batch_format="pyarrow")
                    .to_arrow_refs())
                if t.num_columns and len(t)
            ]
            if foreign_tbls:
                foreign = pa.concat_tables(foreign_tbls)
                fpid = foreign.column("partition_id").to_numpy()
                for tgt in range(E):
                    if tgt == me:
                        continue
                    sub = foreign.filter(pa.array(fpid % E == tgt))
                    if len(sub):
                        store.append_fragment(
                            "mailbox", sub, pass_id,
                            tag=f"inbox-e{tgt}-from-e{me}")
            new_rows_ds = new_rows_ds.map_batches(_own_filter,
                                                  batch_format="pyarrow")
        append_pieces.append(
            new_rows_ds.map_batches(_to_append_shape(order_kind=1),
                                    batch_format="pyarrow"))
    if append_pieces:
        app = append_pieces[0]
        for x in append_pieces[1:]:
            app = app.union(x)
        assigned = app.groupby("partition_id").map_groups(
            make_rowid_assigner(dict(state.next_rowid), pass_id),
            batch_format="pyarrow",
        )
        frag_tbls = ray.get(assigned.to_arrow_refs())
        frag_tbls = [t.select([f.name for f in FRONTIER])
                     for t in frag_tbls if t.num_columns and len(t)]
        if frag_tbls:
            frag = pa.concat_tables(frag_tbls)
            n_new_links = len(frag)
            fpid = frag.column("partition_id").to_numpy()
            for p, n in zip(*np.unique(fpid, return_counts=True)):
                state.next_rowid[int(p)] = (state.next_rowid.get(int(p), 0)
                                            + int(n))
            store.append_fragment("frontier", frag, pass_id,
                                  tag=_etag(cfg, "append"),
                                  meta=_frontier_meta(frag))
            # ---- auto-salt detection (SURVEY.md §4.1): a Zipf head
            # that EMERGES mid-crawl is spotted from this pass's
            # appended rows (the A1 per-host rollup, already on the
            # driver) and salted for every LATER pass — its future rows
            # spread across partitions by url_hash instead of pinning
            # one partition. Deterministic (pure function of the
            # committed frontier), so a replayed pass re-derives the
            # identical set; persisted in meta below for resume.
            # Multi-engine note: each engine detects from its OWN
            # appends, so engines can transiently disagree on a host's
            # salted status and the same discovered URL may land in
            # two partitions (owned by different engines). That breaks
            # only the co-location assumption of the frontier-append
            # EXACT dedup — the seen set still dedups at schedule
            # time, so delivery stays effectively-once (tested by
            # test_multi_engine_auto_salt_union); the cost is a few
            # duplicate frontier rows, not duplicate documents.
            if cfg.auto_salt_share_milli > 0:
                hosts_a, counts_a = np.unique(
                    frag.column("host").to_numpy(zero_copy_only=False),
                    return_counts=True)
                hot = ((counts_a * 1000
                        > cfg.auto_salt_share_milli * len(frag))
                       & (counts_a >= cfg.auto_salt_min_rows))
                new_hot = [h for h in hosts_a[hot]
                           if h not in state.salted_hosts]
                if new_hot:
                    state.salted_hosts = tuple(sorted(
                        set(state.salted_hosts) | set(new_hot)))
    _mark("frontier_append")

    # ---- next retry table (from the slim collection) ---------------------
    failed_m = (sched_a == "scheduled") & ~ok_a
    deferred_retry_m = (sched_a == "deferred") & ~is_scan
    keep_m = failed_m | deferred_retry_m
    rslim = slim.loc[keep_m]
    att = rslim["attempts"].to_numpy().astype(np.int32) \
        + failed_m[keep_m].astype(np.int32)
    last_err = np.where(failed_m[keep_m], rslim["error"].to_numpy(),
                        rslim["last_error"].to_numpy())
    retry_next = pa.table(
        {
            "rowid": pa.array(rslim["rowid"].to_numpy()),
            "partition_id": pa.array(
                rslim["partition_id"].to_numpy().astype(np.int32)),
            "url": pa.array(rslim["url"].tolist(), type=pa.string()),
            "canonical_url": pa.array(rslim["canonical_url"].tolist(),
                                      type=pa.string()),
            "host": pa.array(rslim["host"].tolist(), type=pa.string()),
            "url_hash": pa.array(rslim["url_hash"].to_numpy().astype(np.uint64)),
            "host_hash": pa.array(
                rslim["host_hash"].to_numpy().astype(np.uint64)),
            "priority": pa.array(
                rslim["priority"].to_numpy().astype(np.float32)),
            "depth": pa.array(rslim["depth"].to_numpy().astype(np.int32)),
            "pass_added": pa.array(rslim["pass_added"].to_numpy()),
            "attempts": pa.array(att),
            "last_error": pa.array(last_err.tolist(), type=pa.string()),
        },
        schema=RETRY,
    ) if keep_m.any() else _empty_retry()
    _mark("retry")

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

    # ---- commit (docs + lineage sinks must be durable BEFORE meta
    # commits) -------------------------------------------------------------
    docs_fut.result()
    lineage_fut.result()
    pool.shutdown()
    _mark("docs_write_join")
    state.pass_id = pass_id
    _write_state_fragments(store, cfg, state, retry_tbl=retry_next)
    store.write_meta({"pass_id": pass_id,
                      "num_partitions": cfg.num_partitions,
                      "drained": state.drained,
                      "salted_hosts": sorted(state.salted_hosts)},
                     name=_meta_name(cfg))
    _mark("checkpoint")
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
        "timings": _tm,
        "done": False,
    }


def _append_shape_from_pandas(df: pd.DataFrame, order_kind: int) -> pa.Table:
    """Driver-side twin of _to_append_shape for the (bounded) deferred set."""
    n = len(df)
    return pa.table(
        {
            "partition_id": pa.array(
                df["partition_id"].to_numpy().astype(np.int32)),
            "url": pa.array(df["url"].tolist(), type=pa.string()),
            "canonical_url": pa.array(df["canonical_url"].tolist(),
                                      type=pa.string()),
            "host": pa.array(df["host"].tolist(), type=pa.string()),
            "url_hash": pa.array(df["url_hash"].to_numpy().astype(np.uint64)),
            "host_hash": pa.array(df["host_hash"].to_numpy().astype(np.uint64)),
            "priority": pa.array(df["priority"].to_numpy().astype(np.float32)),
            "depth": pa.array(df["depth"].to_numpy().astype(np.int32)),
            "order_kind": pa.array(np.full(n, order_kind, dtype=np.int8)),
            "order_a": pa.array(df["rowid"].to_numpy().astype(np.int64)),
        }
    )


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
    store.write_meta({"pass_id": pass_id, "num_partitions": cfg.num_partitions,
                      "drained": state.drained,
                      "salted_hosts": sorted(state.salted_hosts)},
                     name=_meta_name(cfg))
    return {"pass_id": pass_id, "candidates": 0, "scanned": 0, "scheduled": 0,
            "fetched": 0, "errors": 0, "deferred": 0, "new_frontier_rows": 0,
            "retry_size": 0, "dead": n_dead, "advanced_partitions": [],
            "wall_ms": int((time.monotonic() - t0) * 1000), "done": True}


def enumerate_partitions(store: TableStore,
                         committed_passes: int | None = None) -> list[int]:
    """S3 analog (the account-wildcard enumerator [recon:
    ``container_crawler/__init__.py:≈120–150``]): list the partition ids
    present in the frontier, from fragment metadata/files — the driver-side
    fan-out source when partitions are not known a priori."""
    import pyarrow.parquet as pq

    parts: set[int] = set()
    for f in store.fragments("frontier", committed_passes):
        t = pq.read_table(f, columns=["partition_id"])
        parts.update(np.unique(t.column("partition_id").to_numpy()).tolist())
    return sorted(parts)


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


def run_always(root: str, cfg: CrawlConfig,
               seed_urls: list[str] | None = None,
               poll_interval: float = 5.0, max_polls: int = 3,
               handler=None) -> list[dict]:
    """Reference entry point 1 [recon: ``container_crawler/__init__.py:
    ≈100–115``]: run_once + sleep(poll_interval), forever. Here the loop is
    bounded by *max_polls* (a daemon wrapper would pass a large value);
    each poll is one pass over every owned partition, so new frontier
    appends made between polls are picked up incrementally via the
    watermarks — the change-data-capture shape of the reference."""
    if seed_urls is not None:
        store, state = init_run(root, cfg, seed_urls)
    else:
        store, state = resume_run(root, cfg)
    robots_ref = ray.put(state.robots)
    polls = []
    try:
        for _ in range(max_polls):
            stats = run_pass(store, cfg, state, robots_ref=robots_ref,
                             handler=handler)
            polls.append(stats)
            if not (stats["done"] and stats["retry_size"] == 0):
                time.sleep(poll_interval)
    finally:
        state.seen.teardown()
    return polls


def destroy_run_actors(root: str, cfg: CrawlConfig) -> int:
    """Reclaim a run's detached seen-shard actors without resuming it —
    the cleanup path for a run that crashed before ``teardown()`` (a
    detached actor outlives its creator by design, so an abandoned run
    would otherwise hold its shard memory until the cluster restarts).
    Reads the run's ``seen_run_id`` from the committed meta and kills
    every shard actor that still exists. Returns the kill count."""
    from ..state.seen import NAMESPACE

    store = TableStore(root)
    meta = store.read_meta("seen_run.json") or store.read_meta() or {}
    if "seen_run_id" not in meta:
        return 0
    run_id = meta["seen_run_id"]
    killed = 0
    for i in range(cfg.seen_shards):
        try:
            a = ray.get_actor(f"seen-{run_id}-{i}", namespace=NAMESPACE)
        except ValueError:
            continue
        ray.kill(a)
        killed += 1
    return killed
