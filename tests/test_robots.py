"""robots.txt parser unit tests: classic allow/disallow precedence,
group selection, crawl-delay, and integration with the scheduler's
first-match evaluator."""

from __future__ import annotations

from container_crawler_ray.functions.robots import (
    parse_robots_txt, robots_from_texts)
from container_crawler_ray.stages.politeness import _allowed

BASIC = """
# comment
User-agent: *
Disallow: /private/
Allow: /private/public/
Crawl-delay: 2
"""


def test_longest_prefix_allow_wins():
    r = parse_robots_txt(BASIC)
    assert r["crawl_delay_ms"] == 2000
    assert _allowed(r["rules"], "/private/secret") is False
    assert _allowed(r["rules"], "/private/public/x") is True
    assert _allowed(r["rules"], "/open") is True


def test_disallow_all_and_empty_disallow():
    r = parse_robots_txt("User-agent: *\nDisallow: /\n")
    assert _allowed(r["rules"], "/") is False
    assert _allowed(r["rules"], "/anything") is False
    r2 = parse_robots_txt("User-agent: *\nDisallow:\n")
    assert _allowed(r2["rules"], "/anything") is True


def test_specific_agent_group_beats_star():
    txt = """
User-agent: *
Disallow: /

User-agent: goodbot
Allow: /
Crawl-delay: 0.5
"""
    star = parse_robots_txt(txt, user_agent="otherbot")
    good = parse_robots_txt(txt, user_agent="goodbot/1.0")
    assert _allowed(star["rules"], "/x") is False
    assert _allowed(good["rules"], "/x") is True
    assert good["crawl_delay_ms"] == 500


def test_equal_length_allow_outranks_disallow():
    txt = "User-agent: *\nDisallow: /dir/\nAllow: /dir2\n"
    r = parse_robots_txt(txt)
    # distinct prefixes still decide correctly
    assert _allowed(r["rules"], "/dir/a") is False
    assert _allowed(r["rules"], "/dir2/a") is True
    # same prefix listed both ways: Allow wins the tie
    txt2 = "User-agent: *\nDisallow: /p\nAllow: /p\n"
    r2 = parse_robots_txt(txt2)
    assert _allowed(r2["rules"], "/p/x") is True


def test_missing_or_empty_file_allows_all():
    r = parse_robots_txt("")
    assert r["rules"] == [{"allow": True, "path_prefix": "/"}]
    assert r["crawl_delay_ms"] == 1000


def test_stacked_user_agents_share_group():
    txt = "User-agent: a\nUser-agent: b\nDisallow: /x\n"
    for ua in ("a", "b"):
        r = parse_robots_txt(txt, user_agent=ua)
        assert _allowed(r["rules"], "/x/1") is False


def test_robots_from_texts_shape_matches_engine_input():
    lookup = robots_from_texts({
        "h1.example": "User-agent: *\nDisallow: /\n",
        "h2.example": BASIC,
    })
    assert set(lookup) == {"h1.example", "h2.example"}
    for v in lookup.values():
        assert set(v) == {"crawl_delay_ms", "rules"}
        assert all(set(r) == {"allow", "path_prefix"} for r in v["rules"])


def test_parsed_rules_drive_a_crawl(ray_session, tmp_path):
    """End-to-end: raw robots.txt bodies gate a real crawl pass."""
    from container_crawler_ray.config import CrawlConfig
    from container_crawler_ray.pipelines.crawl import init_run, run_pass
    from container_crawler_ray.sources import synth

    cfg = CrawlConfig(num_partitions=4, items_chunk=100, workers=2,
                      seen_shards=2, n_hosts=6, n_paths=50,
                      pass_time_ms=2000)
    seeds = synth.make_seed_urls(60, n_hosts=6)
    texts = {synth.host_name(i): "User-agent: *\nAllow: /\n"
             for i in range(6)}
    texts[synth.host_name(3)] = "User-agent: *\nDisallow: /\n"
    store, state = init_run(str(tmp_path / "run"), cfg, seeds,
                            robots=robots_from_texts(texts))
    stats = run_pass(store, cfg, state)
    assert stats["fetched"] > 0
    import glob

    import pyarrow.parquet as pq
    hosts = set()
    for f in glob.glob(f"{tmp_path}/run/tables/documents/*/*.parquet"):
        hosts.update(pq.read_table(f, columns=["host"])
                     .column("host").to_pylist())
    assert synth.host_name(3) not in hosts      # fully disallowed
    assert hosts, "permissive hosts fetched"
    state.seen.teardown()
