"""Unit tests: hashing, canonicalization, synth world determinism."""

import numpy as np

from container_crawler_ray.functions.canonicalize import (
    canonicalize_url, host_of, path_of)
from container_crawler_ray.functions.hashing import hash64, hash64_many, mix64
from container_crawler_ray.sources import synth


def test_hash64_deterministic_and_vectorized():
    assert hash64("abc") == hash64(b"abc")
    arr = hash64_many(["abc", "def", "abc"])
    assert arr.dtype == np.uint64
    assert arr[0] == hash64("abc") == arr[2]
    assert arr[1] == hash64("def")


def test_mix64_scalar_matches_vector():
    xs = np.array([1, 2, 2**63 + 5], dtype=np.uint64)
    v = mix64(xs)
    for i, x in enumerate(xs.tolist()):
        assert mix64(int(x)) == int(v[i])


def test_canonicalize_rules():
    # case, default port, fragment, query-key sort (FIXTURES.md §1 variant)
    assert canonicalize_url("HTTP://H0001.EXAMPLE:80/p/7#frag") == \
        "http://h0001.example/p/7"
    assert canonicalize_url("http://a.example/x?b=2&a=1") == \
        "http://a.example/x?a=1&b=2"
    assert canonicalize_url("https://a.example:443/") == "https://a.example/"
    assert canonicalize_url("https://a.example:8443/x") == \
        "https://a.example:8443/x"
    assert canonicalize_url("http://a.example") == "http://a.example/"
    assert canonicalize_url("http://a.example/%7Euser/%2fx") == \
        "http://a.example/~user/%2Fx"


def test_canonicalize_idempotent():
    urls = synth.make_seed_urls(500)
    for u in urls:
        c = canonicalize_url(u)
        assert canonicalize_url(c) == c
        assert host_of(c)
        assert path_of(c).startswith("/")


def test_synth_world_deterministic():
    a = synth.make_seed_urls(1000)
    b = synth.make_seed_urls(1000)
    assert a == b
    u = "http://h0003.example/p/42"
    assert synth.make_spans(u) == synth.make_spans(u)
    spans = synth.make_spans(u)
    # offsets strictly increasing, kind/text/media consistent
    offs = [s["offset"] for s in spans]
    assert offs == sorted(offs) and len(set(offs)) == len(offs)
    for s in spans:
        if s["kind"] == "text":
            assert s["text"] and not s["media_ref"]
        else:
            assert s["media_ref"] and not s["text"]
    links = synth.out_links(u, 200, 1000)
    assert 2 <= len(links) <= 5
    assert all(l.startswith("http://h") for l in links)


def test_robots_rules():
    rules = synth.robots_rules("h0010.example")
    assert synth.path_allowed(rules, "/p/2")
    assert not synth.path_allowed(rules, "/p/1")
    assert not synth.path_allowed(rules, "/p/15")  # prefix match
    rules_all = synth.robots_rules("h0199.example")
    assert not synth.path_allowed(rules_all, "/")
    assert synth.robots_delay_ms("h0000.example") == 10


def test_hll_sketch_properties():
    """Mergeable-sketch laws the distributed aggregate relies on:
    commutative merge, empty identity, partition-invariance (any split
    of the input merges to the same registers), and sane estimates."""
    import numpy as np

    from container_crawler_ray.functions.sketch import (
        hll_add, hll_empty, hll_estimate, hll_merge)

    vals = np.arange(20_000, dtype=np.uint64)
    direct = hll_add(hll_empty(), vals)
    # partition-invariance over an arbitrary 3-way split
    a = hll_add(hll_empty(), vals[:5_000])
    b = hll_add(hll_empty(), vals[5_000:13_000])
    c = hll_add(hll_empty(), vals[13_000:])
    merged = hll_merge(hll_merge(a, b), c)
    assert (merged == direct).all()
    assert (hll_merge(a, b) == hll_merge(b, a)).all()
    assert (hll_merge(a, hll_empty()) == a).all()
    est = hll_estimate(direct)
    assert abs(est - 20_000) / 20_000 < 0.05, f"estimate {est}"
    # duplicates must not change the registers
    dup = hll_add(hll_add(hll_empty(), vals), vals)
    assert (dup == direct).all()


def test_cms_sketch_properties():
    """Count-Min laws the distributed cell-merge relies on: the sketch
    is a pure function of the insert MULTISET (partition-invariant sum
    of per-split sketches), estimates are one-sided (est >= true) and
    exact when width comfortably exceeds the key count."""
    import numpy as np

    from container_crawler_ray.state import cms

    rng = np.random.default_rng(7)
    keys = rng.integers(0, 1 << 63, size=500, dtype=np.uint64)
    counts = rng.integers(1, 100, size=500).astype(np.int64)

    direct = cms.sketch_counts(keys, counts)
    split = (cms.sketch_counts(keys[:200], counts[:200])
             + cms.sketch_counts(keys[200:], counts[200:]))
    assert (split == direct).all()

    est = cms.estimate(direct, keys)
    assert (est >= counts).all()  # one-sided error
    # 500 keys in 4x2048 cells: expected collisions per row ~ n/width;
    # min over 4 independent rows is almost surely exact.
    assert (est == counts).mean() > 0.95
    assert direct.sum() == counts.sum() * cms.DEPTH
