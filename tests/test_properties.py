"""Property-based tests (SURVEY.md §5.2) with hypothesis: canonicalizer
idempotence, cuckoo/bloom no-false-negatives, watermark monotonicity on
the oracle (cheap — the engine is conformance-locked to it)."""

import numpy as np
from hypothesis import given, settings, strategies as st

from container_crawler_ray.config import CrawlConfig
from container_crawler_ray.functions.canonicalize import canonicalize_url
from container_crawler_ray.state.cuckoo import SpillFilter

from .oracle import init_oracle, run_oracle_pass

url_strategy = st.builds(
    lambda scheme, host, port, path, q, frag:
        f"{scheme}://{host}{port}/{path}{q}{frag}",
    scheme=st.sampled_from(["http", "HTTP", "https", "HTTPS"]),
    host=st.from_regex(r"[a-zA-Z][a-zA-Z0-9.-]{0,20}", fullmatch=True),
    port=st.sampled_from(["", ":80", ":443", ":8080"]),
    path=st.from_regex(r"[a-zA-Z0-9/_.~%-]{0,30}", fullmatch=True),
    q=st.sampled_from(["", "?b=2&a=1", "?z=9&a=1&m=3"]),
    frag=st.sampled_from(["", "#x", "#frag"]),
)


@settings(max_examples=200, deadline=None)
@given(url_strategy)
def test_canonicalize_idempotent_prop(url):
    c = canonicalize_url(url)
    assert canonicalize_url(c) == c


@settings(max_examples=20, deadline=None)
@given(st.lists(st.integers(min_value=1, max_value=2**63 - 1),
                min_size=1, max_size=500, unique=True))
def test_seen_set_no_false_negatives(keys):
    f = SpillFilter(256, 1 << 14)  # tiny → exercises the spill tier
    arr = np.array(keys, dtype=np.uint64)
    novel = f.contains_add_many(arr)
    assert novel.all()
    assert f.contains_many(arr).all()       # NO false negatives, ever
    assert not f.contains_add_many(arr).any()


@settings(max_examples=10, deadline=None)
@given(st.integers(min_value=0, max_value=2**31), st.integers(2, 6))
def test_oracle_watermark_monotone_and_effectively_once(seed, passes):
    """Watermarks never regress; no URL is ever fetched twice."""
    from container_crawler_ray.sources.synth import make_seed_urls

    cfg = CrawlConfig(num_partitions=4, items_chunk=50, n_hosts=10,
                      n_paths=60, pass_time_ms=3000, fail_mod=11)
    st_, robots = init_oracle(cfg, make_seed_urls(80, seed=seed, n_hosts=10))
    prev = dict(st_.watermarks)
    fetched_urls: list[str] = []
    for _ in range(passes):
        run_oracle_pass(cfg, st_, robots)
        for p, w in st_.watermarks.items():
            assert w >= prev[p], "watermark regressed"
        prev = dict(st_.watermarks)
    fetched_urls = [d["url"] for d in st_.docs]
    assert len(fetched_urls) == len(set(fetched_urls)), \
        "a URL was fetched twice (effectively-once violated)"
