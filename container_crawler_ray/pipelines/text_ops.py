"""Rows-only text-analysis pipelines (heuristics with no SQL equivalent):
language-ID, quality scoring, winnowing fingerprints."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from ..functions.text import lang_id, quality_scores, winnow_fingerprint


def text_analysis_batch(t: pa.Table) -> pa.Table:
    """All three heuristic columns in one pass over the batch. Task-mode
    ``map_batches`` (autoscales with the cluster); a real model-scoring
    stage would instead be a callable class loading the model once per
    actor in ``__init__`` — see ``media.MediaDecodeStage`` for that shape.
    """
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
    return ds.map_batches(text_analysis_batch,
                          batch_format="pyarrow").to_pandas()
