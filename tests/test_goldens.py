"""Golden-file conformance: the distributed pipelines must match the
independent single-process implementations in tools/make_goldens.py,
value-exact, at the driver's oracle scale (sf0.01).

The goldens under tests/golden/ are committed; regenerate with
``python tools/make_goldens.py`` only when the OPERATOR SPEC changes
(never to paper over a pipeline regression).
"""

from __future__ import annotations

import os

import pandas as pd
import pyarrow.parquet as pq
import pytest

SF = "/root/testdata/sf0.01"
GOLD = os.path.join(os.path.dirname(__file__), "golden")

GOLDEN_QUERIES = [
    "simhash_docs", "simhash_dup_pairs", "text_analysis",
    "minhash_lsh_groups", "curate_dedup", "embedding_dup_groups",
    "pack_sequences", "curate_pack", "interleaved_pack",
    "pagerank_parts", "users_per_event_type_hll",
    "knn_lsh", "knn_ivf", "knn_ivfpq", "embedding_rp",
    "frontier_host_stats", "crawl_pass_docs",
    "token_freq_cms", "lm_bigram_scores", "kmeans_clusters",
    "semantic_dedup", "bm25_scores", "strip_dup_windows",
    "part_components", "events_weighted_sample",
    "docs_compression_ratio", "events_entropy_per_user",
    "bpe_merges", "events_value_ewma", "part_kcore",
]


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    return df.sort_values(list(df.columns)).reset_index(drop=True)


@pytest.mark.parametrize("name", GOLDEN_QUERIES)
def test_golden_match(ray_session, name):
    import __ray_entry__ as em

    got = em.queries()[name](SF)
    if not hasattr(got, "columns"):
        got = got.to_pandas()
    want = pq.read_table(os.path.join(GOLD, f"{name}.parquet")).to_pandas()
    g, w = _norm(pd.DataFrame(got)), _norm(want)
    assert list(g.columns) == list(w.columns)
    assert [str(t) for t in g.dtypes] == [str(t) for t in w.dtypes]
    assert len(g) == len(w)
    for c in g.columns:
        assert (g[c].values == w[c].values).all(), f"column {c} differs"
