"""Spec oracle: a single-threaded, dict-based simulator of the crawl
semantics (SURVEY.md §5.2). The local reference checkout is empty, so this
is the conformance ground truth: same seed list, same politeness budget,
same mod-ownership, same watermark rule, same deterministic world
(container_crawler_ray.sources.synth — shared WORLD, independent ENGINE).

It deliberately shares only the world functions (hash64, canonicalize,
spans/links/robots generators) with the engine; every scheduling/state
decision is re-implemented here in plain Python so an engine bug cannot
hide in shared code.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from container_crawler_ray.config import CrawlConfig
from container_crawler_ray.functions.canonicalize import (
    canonicalize_url, host_of, path_of)
from container_crawler_ray.functions.hashing import hash64
from container_crawler_ray.sources import synth


@dataclass
class Row:
    rowid: int
    partition_id: int
    url: str
    canonical_url: str
    host: str
    url_hash: int
    host_hash: int
    priority_n: int          # integer priority numerator (float32-safe)
    depth: int
    pass_added: int
    attempts: int = 0
    last_error: str = ""
    src: str = "scan"


@dataclass
class OracleState:
    frontier: dict[int, list[Row]] = field(default_factory=dict)  # per partition
    watermarks: dict[int, int] = field(default_factory=dict)
    next_rowid: dict[int, int] = field(default_factory=dict)
    buckets: dict[str, float] = field(default_factory=dict)
    seen: set[int] = field(default_factory=set)
    retry: list[Row] = field(default_factory=list)
    docs: list[dict] = field(default_factory=list)   # doc_id,url,host,pass_id,spans
    pass_id: int = 0


def _partition_of(cfg: CrawlConfig, host: str, host_hash: int, url_hash: int) -> int:
    if host in cfg.salted_hosts:
        return url_hash % cfg.num_partitions
    return host_hash % cfg.num_partitions


def _mk_row(cfg: CrawlConfig, url: str, depth: int, pass_added: int,
            priority_src: str | None = None) -> Row:
    canon = canonicalize_url(url)
    host = host_of(canon)
    uh = hash64(canon)
    hh = hash64(host)
    pn = hash64(priority_src if priority_src is not None else url) % 1000
    return Row(rowid=-1, partition_id=_partition_of(cfg, host, hh, uh),
               url=url, canonical_url=canon, host=host, url_hash=uh,
               host_hash=hh, priority_n=pn, depth=depth, pass_added=pass_added)


def init_oracle(cfg: CrawlConfig, seed_urls: list[str],
                robots: dict[str, dict] | None = None) -> tuple[OracleState, dict]:
    st = OracleState()
    st.watermarks = {p: -1 for p in range(cfg.num_partitions)}
    robots = robots if robots is not None else synth.robots_lookup(cfg.n_hosts)
    for u in seed_urls:
        r = _mk_row(cfg, u, depth=0, pass_added=0, priority_src=u)
        p = r.partition_id
        r.rowid = st.next_rowid.get(p, 0)
        st.next_rowid[p] = r.rowid + 1
        st.frontier.setdefault(p, []).append(r)
    return st, robots


def _skip_all(robots: dict, host: str) -> bool:
    rb = robots.get(host)
    if not rb:
        return False
    return not synth.path_allowed(rb["rules"], "/")


def run_oracle_pass(cfg: CrawlConfig, st: OracleState, robots: dict) -> dict:
    pass_id = st.pass_id + 1
    owned_parts = [p for p in range(cfg.num_partitions)
                   if p % cfg.num_engines == cfg.engine_index
                   and p not in cfg.skip_partitions]

    # 1. scan: per-partition rowid order, chunk-limited
    scan_rows: list[Row] = []
    scan_stats: dict[int, tuple[int, int]] = {}  # p -> (count, max_rowid)
    for p in owned_parts:
        rows = [r for r in st.frontier.get(p, []) if r.rowid > st.watermarks[p]]
        rows.sort(key=lambda r: r.rowid)
        rows = rows[: cfg.items_chunk]
        if rows:
            scan_stats[p] = (len(rows), rows[-1].rowid)
        for r in rows:
            r2 = Row(**{**r.__dict__})
            r2.src, r2.attempts, r2.last_error = "scan", 0, ""
            scan_rows.append(r2)

    # 2. retry injection (attempts < max live; rest dead-lettered)
    live_retry = [r for r in st.retry if r.attempts < cfg.max_attempts]
    for r in live_retry:
        r.src = "retry"
    cand = scan_rows + live_retry
    if not cand:
        st.pass_id = pass_id
        st.retry = []
        return {"pass_id": pass_id, "fetched": 0, "scheduled": 0, "done": True}

    # 3/4. per-host scheduling
    by_host: dict[str, list[Row]] = {}
    for r in cand:
        by_host.setdefault(r.host, []).append(r)

    tags: dict[int, str] = {}  # id(row) -> tag
    scheduled: list[Row] = []
    err_gate: dict[int, int] = {}
    host_present: set[str] = set()
    sched_count: dict[str, int] = {}
    for host, rows in by_host.items():
        owned = [r for r in rows if r.rowid % cfg.num_nodes == cfg.node_id]
        verify = [r for r in rows if r.rowid % cfg.num_nodes != cfg.node_id]
        for r in verify:
            if r.url_hash in st.seen:
                tags[id(r)] = "verify_ok"
            else:
                tags[id(r)] = "verify_miss"
                err_gate[r.partition_id] = err_gate.get(r.partition_id, 0) + 1
        if owned:
            host_present.add(host)
        # dedup: retry first, then rowid asc
        claimed: set[int] = set()
        for r in sorted(owned, key=lambda r: (r.src != "retry", r.rowid)):
            if r.url_hash in claimed:
                tags[id(r)] = "dup"
            else:
                claimed.add(r.url_hash)
        rest = [r for r in owned if id(r) not in tags]
        # cross-pass seen drop (scan branch only)
        for r in rest:
            if r.src != "retry" and r.url_hash in st.seen:
                tags[id(r)] = "seen"
        rest = [r for r in rest if id(r) not in tags]
        # robots
        rb = robots.get(host)
        rules = rb["rules"] if rb else [{"allow": True, "path_prefix": "/"}]
        delay = rb["crawl_delay_ms"] if rb else 1000
        if not synth.path_allowed(rules, "/"):
            for r in rest:
                tags[id(r)] = "skipped_host"
            continue
        allowed = []
        for r in rest:
            if synth.path_allowed(rules, path_of(r.canonical_url)):
                allowed.append(r)
            else:
                tags[id(r)] = "disallowed"
        # token bucket + priority top-k
        rate = cfg.pass_time_ms / max(1.0, float(delay))
        cap = max(1.0, cfg.bucket_capacity_factor * rate)
        stored = st.buckets.get(host, cap)
        avail = min(cap, stored + rate)
        budget = int(avail)
        allowed.sort(key=lambda r: (-r.priority_n, r.rowid))
        for r in allowed[:budget]:
            tags[id(r)] = "scheduled"
            scheduled.append(r)
        for r in allowed[budget:]:
            tags[id(r)] = "deferred"
        sched_count[host] = len(allowed[:budget])

    # 5. seen add (scheduled scan rows)
    for r in scheduled:
        if r.src == "scan":
            st.seen.add(r.url_hash)

    # 6. fetch
    fetched: list[Row] = []
    failed: list[Row] = []
    for r in scheduled:
        if r.attempts == 0 and synth.fails_first_attempt(r.canonical_url,
                                                         cfg.fail_mod):
            failed.append(r)
            if r.src == "scan":
                err_gate[r.partition_id] = err_gate.get(r.partition_id, 0) + 1
        else:
            fetched.append(r)
            st.docs.append({
                "doc_id": f"{r.url_hash:016x}",
                "url": r.canonical_url,
                "host": r.host,
                "pass_id": pass_id,
                "spans": synth.make_spans(r.canonical_url),
            })

    # 7. watermark gating
    advanced: set[int] = set()
    for p, (cnt, mx) in scan_stats.items():
        if cnt > 0 and err_gate.get(p, 0) == 0:
            st.watermarks[p] = mx
            advanced.add(p)

    # 8. bucket updates
    for host in host_present:
        if _skip_all(robots, host):
            continue
        rb = robots.get(host)
        delay = rb["crawl_delay_ms"] if rb else 1000
        rate = cfg.pass_time_ms / max(1.0, float(delay))
        cap = max(1.0, cfg.bucket_capacity_factor * rate)
        stored = st.buckets.get(host, cap)
        st.buckets[host] = min(cap, stored + rate) - sched_count.get(host, 0)

    # 9. link expansion → new frontier rows
    link_depth: dict[str, int] = {}
    for r in fetched:
        for link in synth.out_links(r.canonical_url, cfg.n_hosts, cfg.n_paths):
            canon = canonicalize_url(link)
            if hash64(canon) in st.seen:
                continue
            d = r.depth + 1
            if canon not in link_depth or d < link_depth[canon]:
                link_depth[canon] = d

    # 10/11. append assembly: deferred (advanced partitions) first by old
    # rowid, then links by canonical_url; per-partition rowid sequences
    appends: dict[int, list[tuple]] = {}
    for host, rows in by_host.items():
        for r in rows:
            if tags.get(id(r)) == "deferred" and r.src == "scan" \
                    and r.partition_id in advanced:
                appends.setdefault(r.partition_id, []).append(
                    (0, r.rowid, r.canonical_url, r))
    for canon, d in link_depth.items():
        nr = _mk_row(cfg, canon, depth=d, pass_added=pass_id,
                     priority_src=canon)
        appends.setdefault(nr.partition_id, []).append(
            (1, 0, canon, nr))
    for p, items in appends.items():
        items.sort(key=lambda x: (x[0], x[1], x[2]))
        for kind, _, _, r in items:
            nr = Row(**{**r.__dict__})
            nr.rowid = st.next_rowid.get(p, 0)
            nr.pass_added = pass_id
            nr.src, nr.attempts, nr.last_error = "scan", 0, ""
            st.next_rowid[p] = nr.rowid + 1
            st.frontier.setdefault(p, []).append(nr)

    # 12. retry table
    new_retry: list[Row] = []
    for r in failed:
        nr = Row(**{**r.__dict__})
        nr.attempts = r.attempts + 1
        nr.last_error = f"RetryError: transient fetch error: {r.canonical_url}"
        new_retry.append(nr)
    for host, rows in by_host.items():
        for r in rows:
            if tags.get(id(r)) == "deferred" and r.src == "retry":
                new_retry.append(r)
    st.retry = new_retry

    st.pass_id = pass_id
    return {"pass_id": pass_id, "fetched": len(fetched),
            "scheduled": len(scheduled), "done": False}


def run_oracle(cfg: CrawlConfig, seed_urls: list[str], max_passes: int,
               robots: dict | None = None) -> OracleState:
    st, robots = init_oracle(cfg, seed_urls, robots)
    while st.pass_id < max_passes:
        stats = run_oracle_pass(cfg, st, robots)
        if stats["done"] and not st.retry:
            break
    return st
