"""Tests for the user-extension surface (SURVEY.md §2.10) and remaining
reference behaviors: custom handlers, RetryError, wildcard enumerator,
dead-lettering, run_always polling, hot-host salting conformance."""

import glob
import json

import pyarrow.parquet as pq
import pytest

from container_crawler_ray.config import CrawlConfig
from container_crawler_ray.pipelines.crawl import (
    enumerate_partitions, init_run, run_always, run_crawl, run_pass)
from container_crawler_ray.sources.synth import make_seed_urls
from container_crawler_ray.stages.fetch import FetchHandler, RetryError

BASE = dict(num_partitions=4, items_chunk=100, workers=2, seen_shards=2,
            n_hosts=20, n_paths=100, pass_time_ms=4000)


def _docs(root):
    return [d for f in sorted(glob.glob(f"{root}/tables/documents/*/*.parquet"))
            for d in pq.read_table(f).to_pylist()]


class UppercaseHandler(FetchHandler):
    """A user plugin: one text span with the uppercased path, no links."""

    def setup(self, ctx):
        self.ctx = ctx
        self.prefix = "DOC:"  # per-actor state

    def handle_row(self, row):
        path = row["canonical_url"].rsplit("/", 1)[-1]
        return {
            "spans": [{"kind": "text", "text": self.prefix + path.upper(),
                       "media_ref": "", "offset": 0}],
            "links": [],
        }


class AlwaysRetryHandler(FetchHandler):
    def handle_row(self, row):
        raise RetryError("nope")


def test_custom_handler_plugin(tmp_store):
    cfg = CrawlConfig(**BASE, fail_mod=0)
    out = run_crawl(tmp_store, cfg,
                    seed_urls=["http://h0001.example/p/7",
                               "http://h0002.example/p/9"],
                    max_passes=1, handler=UppercaseHandler())
    assert out["total_fetched"] == 2
    docs = _docs(tmp_store)
    texts = {d["spans"][0]["text"] for d in docs}
    assert texts == {"DOC:7", "DOC:9"}
    # no links → frontier did not grow
    assert out["passes"][0]["new_frontier_rows"] == 0


def test_retry_error_dead_letters_after_max_attempts(tmp_store):
    cfg = CrawlConfig(**BASE, fail_mod=0, max_attempts=2)
    store, state = init_run(tmp_store, cfg, ["http://h0001.example/p/1"])
    h = AlwaysRetryHandler()
    s1 = run_pass(store, cfg, state, handler=h)   # fails, attempts=1
    assert s1["errors"] == 1 and s1["retry_size"] == 1
    s2 = run_pass(store, cfg, state, handler=h)   # retry fails, attempts=2
    assert s2["retry_size"] == 1
    s3 = run_pass(store, cfg, state, handler=h)   # attempts>=2 → dead letter
    assert s3["dead"] == 1 and s3["retry_size"] == 0
    dead = pq.read_table(glob.glob(f"{tmp_store}/tables/dead_letter/*.parquet")[0])
    assert dead.column("attempts")[0].as_py() == 2
    assert "RetryError" in dead.column("last_error")[0].as_py()


def test_enumerate_partitions(tmp_store):
    cfg = CrawlConfig(**BASE, fail_mod=0)
    store, _ = init_run(tmp_store, cfg, make_seed_urls(60, n_hosts=20))
    parts = enumerate_partitions(store)
    assert parts and set(parts) <= set(range(4))


def test_run_always_polls(tmp_store):
    cfg = CrawlConfig(**BASE, fail_mod=0)
    polls = run_always(tmp_store, cfg,
                       seed_urls=make_seed_urls(40, n_hosts=10),
                       poll_interval=0.01, max_polls=3)
    assert len(polls) == 3
    assert polls[0]["fetched"] > 0
    # watermarks persist across polls: pass 2 rescans nothing already done
    assert polls[1]["pass_id"] == 2


def test_salted_hot_host_spreads_partitions(tmp_store):
    """Hot-host salting: the Zipf-head host's rows spread across partitions
    by url_hash while politeness still applies per host globally — and the
    engine stays oracle-exact under salting."""
    from .oracle import run_oracle

    cfg = CrawlConfig(**BASE, fail_mod=13,
                      salted_hosts=("h0000.example",))
    seeds = make_seed_urls(300, n_hosts=20)
    out = run_crawl(tmp_store, cfg, seed_urls=seeds, max_passes=3)
    assert out["total_fetched"] > 0
    # the salted host occupies >1 partition in the frontier
    parts = set()
    for f in glob.glob(f"{tmp_store}/tables/frontier/*.parquet"):
        t = pq.read_table(f, columns=["host", "partition_id"])
        for r in t.to_pylist():
            if r["host"] == "h0000.example":
                parts.add(r["partition_id"])
    assert len(parts) > 1, "salting must spread the hot host"
    # oracle conformance under salting
    ora = run_oracle(cfg, seeds, max_passes=3)
    eng_docs = {(d["doc_id"], d["pass_id"]) for d in _docs(tmp_store)}
    ora_docs = {(d["doc_id"], d["pass_id"]) for d in ora.docs}
    assert eng_docs == ora_docs
    meta = json.load(open(f"{tmp_store}/meta.json"))
    ck = pq.read_table(
        f"{tmp_store}/tables/checkpoints/ckpt_{meta['pass_id']:06d}.parquet")
    eng_wm = {r["partition_id"]: r["last_row"] for r in ck.to_pylist()}
    assert eng_wm == ora.watermarks


def test_custom_robots_survive_resume(tmp_store):
    """Robots configured at init are durable: a resumed run (fresh state
    object) enforces the same rules."""
    from container_crawler_ray.pipelines.crawl import resume_run

    robots = {
        "h0001.example": {"crawl_delay_ms": 10,
                          "rules": [{"allow": False, "path_prefix": "/"}]},
        "h0002.example": {"crawl_delay_ms": 10,
                          "rules": [{"allow": True, "path_prefix": "/"}]},
    }
    cfg = CrawlConfig(**BASE, fail_mod=0)
    store, state = init_run(tmp_store, cfg,
                            ["http://h0001.example/p/1",
                             "http://h0002.example/p/2"],
                            robots=robots)
    store2, state2 = resume_run(tmp_store, cfg)
    assert state2.robots == robots
    run_pass(store2, cfg, state2)
    docs = _docs(tmp_store)
    hosts = {d["host"] for d in docs}
    assert hosts == {"h0002.example"}, "disallow-all host must be skipped"
    state.seen.teardown()
    state2.seen.teardown()
