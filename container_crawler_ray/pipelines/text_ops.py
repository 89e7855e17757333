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


_GOPHER_STOPS = ("the", "a", "and", "of")


def gopher_quality_flags(sf_dir: str) -> pd.DataFrame:
    """Gopher-style composite quality gate (Rae et al. 2021, §A1.1 —
    public paper), integerized so the DuckDB twin matches bit-for-bit
    and adapted to rules that are non-degenerate on the synthetic
    corpus: word-count band, mean-word-length band, stopword-kind
    count, unique-token ratio. Emits per-rule columns plus the
    composite ``keep`` so downstream curation can re-weight rules
    without recomputing. Pure map-side (one pass, no exchange);
    at 100 TB this runs as a task-pool ``map_batches`` directly after
    the read with nothing to shuffle."""
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "text"])

    def flags(t: pa.Table) -> pa.Table:
        texts = t.column("text").to_pylist()
        toks = [s.lower().split() for s in texts]
        n_words = np.fromiter((len(w) for w in toks), dtype=np.int64,
                              count=len(toks))
        nonspace = np.fromiter((sum(len(x) for x in w) for w in toks),
                               dtype=np.int64, count=len(toks))
        nw = np.maximum(n_words, 1)
        mean_x100 = nonspace * 100 // nw
        uniq = np.fromiter((len(set(w)) for w in toks), dtype=np.int64,
                           count=len(toks))
        uniq_bp = uniq * 10000 // nw
        stops = np.fromiter(
            (sum(1 for st in _GOPHER_STOPS if st in ws)
             for ws in (set(w) for w in toks)),
            dtype=np.int64, count=len(toks))
        keep = ((n_words >= 30) & (n_words <= 1000)
                & (mean_x100 >= 300) & (mean_x100 <= 600)
                & (stops >= 1) & (uniq_bp >= 3000)).astype(np.int64)
        return pa.table({
            "doc_id": pa.array(t.column("doc_id").to_numpy()
                               .astype(np.int64)),
            "n_words": pa.array(n_words),
            "mean_wlen_x100": pa.array(
                np.where(n_words == 0, 0, mean_x100)),
            "n_stop_kinds": pa.array(stops),
            "uniq_bp": pa.array(np.where(n_words == 0, 0, uniq_bp)),
            "keep": pa.array(keep)})

    return ds.map_batches(flags, batch_format="pyarrow").to_pandas()
