"""Corpus curation: the composed training-data pipeline (stats → quality
filter → near-dup removal → curated corpus). Each stage is one of the
already-tested operators; this module is the end-to-end composition a
100 TB text pipeline runs before tokenization.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import ray.data

from ..functions.text import text_stats_batch


def curate_docs(sf_dir: str, min_tokens: int = 10,
                max_punct: int = 40) -> pd.DataFrame:
    """Quality gate on integer text stats (SQL-checkable): keep documents
    with a sane token count and punctuation level. Returns the kept ids +
    the stats the decision used."""
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "text"])

    def gate(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        stats = text_stats_batch(t)
        keep = pc.and_(
            pc.greater_equal(stats.column("n_tokens"),
                             pa.scalar(min_tokens, type=pa.int64())),
            pc.less_equal(stats.column("n_punct"),
                          pa.scalar(max_punct, type=pa.int64())),
        )
        return stats.filter(keep).select(["doc_id", "n_tokens", "n_punct"])

    return ds.map_batches(gate, batch_format="pyarrow").to_pandas()


def curate_dedup(sf_dir: str, jaccard_tau: float = 0.5) -> pd.DataFrame:
    """Quality gate + MinHash-LSH near-dup removal keeping the smallest
    doc_id per group (rows-only: LSH grouping is not SQL-expressible)."""
    from .dedup import minhash_lsh_groups

    kept = set(curate_docs(sf_dir)["doc_id"])
    groups = minhash_lsh_groups(sf_dir, jaccard_tau=jaccard_tau)
    groups = groups[groups["doc_id"].isin(kept)]
    reps = groups.groupby("group_id", as_index=False)["doc_id"].min()
    out = reps.rename(columns={"doc_id": "keep_id"}).sort_values("keep_id")
    return out.reset_index(drop=True)
