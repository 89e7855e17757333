"""Rows-only text-analysis pipelines (heuristics with no SQL equivalent):
language-ID, quality scoring, winnowing fingerprints."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from ..functions.text import lang_id, quality_scores, winnow_fingerprint


class TextAnalysisStage:
    """One actor-pool stage computing all three heuristic columns (state:
    nothing heavy here, but the shape matches a model-scoring stage —
    load once in __init__, vectorized batch work in __call__)."""

    def __init__(self):
        pass

    def __call__(self, t: pa.Table) -> pa.Table:
        texts = t.column("text").to_pylist()
        quality = quality_scores(texts)
        return pa.table(
            {
                "doc_id": t.column("doc_id"),
                "lang_pred": pa.array(lang_id(texts), type=pa.string()),
                "quality_milli": pa.array(
                    np.floor(quality * 1000).astype(np.int64)),
                "fingerprint": pa.array(winnow_fingerprint(texts)),
            }
        )


def text_analysis(sf_dir: str) -> pd.DataFrame:
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "text"])
    return ds.map_batches(TextAnalysisStage, batch_format="pyarrow",
                          concurrency=2, num_cpus=0.5).to_pandas()
