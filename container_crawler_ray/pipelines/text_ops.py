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


def lm_bigram_scores(sf_dir: str, min_count: int = 1) -> pd.DataFrame:
    """CCNet-style language-model quality scoring (Wenzek et al. 2020 —
    public paper — filters web text by LM perplexity): train a bigram
    count model over the corpus, then score every document by its mean
    per-token add-one-smoothed log-probability (in floor'd milli-nats,
    so the independent golden matches bit-for-bit).

    Distributed shape, both passes streaming:
    - TRAIN: each block emits per-block-deduped (bigram, count)
      partials (``np.unique`` — the exchange moves distinct pairs per
      block, not token occurrences); one ``groupby(pair)`` sum yields
      the model, which is dimension-sized and broadcast ONCE via
      ``ray.put``. At 100 TB the model is pruned map-side with
      ``min_count`` (exactly how CCNet ships a pruned KenLM instead of
      raw counts) and/or trained on a sample — the scoring pass is
      unchanged.
    - SCORE: pure map-side; per block the token stream is flattened
      once, both model lookups are C-level ``pd.Index.get_indexer``
      calls, and per-doc sums are one ``np.add.reduceat`` (sequential
      within each doc's segment, so per-doc float rounding is
      independent of block boundaries — that is what makes the golden
      reproducible).

    Determinism: counts are exact integers; log-probs are float64 from
    identical integers; per-doc summation touches only the doc's own
    segment. Empty docs are dropped (no positions to score).
    """
    import ray

    from ray.data.aggregate import Sum

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "text"])
    # SEP is a space: tokens come from str.split() so they can never
    # contain one (NB a NUL separator dies inside numpy — fixed-width
    # unicode coercion silently strips trailing NULs from the scalar).
    SEP = " "
    BOS = "\x02"  # not a corpus token: doc-start context

    def _flatten(texts):
        """(w1, w2, starts, lens) for the non-empty docs of a batch."""
        toks = [s.split() for s in texts]
        keep = [i for i, tk in enumerate(toks) if tk]
        lens = np.array([len(toks[i]) for i in keep], dtype=np.int64)
        if not keep:
            z = np.array([], dtype=object)
            return z, z, np.array([], dtype=np.int64), lens, keep
        w2 = np.concatenate([np.asarray(toks[i], dtype=object)
                             for i in keep])
        w1 = np.concatenate([np.asarray([BOS] + toks[i][:-1],
                                        dtype=object) for i in keep])
        starts = np.concatenate(([0], np.cumsum(lens)[:-1]))
        return w1, w2, starts, lens, keep

    def pairs(t: pa.Table) -> pa.Table:
        w1, w2, _, _, _ = _flatten(t.column("text").to_pylist())
        if len(w2) == 0:
            return pa.table({"pair": pa.array([], type=pa.string()),
                             "n": pa.array([], type=pa.int64())})
        key, counts = np.unique(w1 + SEP + w2, return_counts=True)
        return pa.table({"pair": pa.array(list(key), type=pa.string()),
                         "n": pa.array(counts.astype(np.int64))})

    model = (ds.map_batches(pairs, batch_format="pyarrow")
             .groupby("pair").aggregate(Sum("n", alias_name="n"))
             .to_pandas())
    model = model[model["n"] >= min_count]
    w1w2 = model["pair"].str.split(SEP, n=1, expand=True)
    vocab = int(w1w2[1].nunique())
    ctx = (pd.DataFrame({"w1": w1w2[0], "n": model["n"]})
           .groupby("w1", as_index=False)["n"].sum())
    big_idx = pd.Index(model["pair"])
    big_n = model["n"].to_numpy(np.int64)
    ctx_idx = pd.Index(ctx["w1"])
    ctx_n = ctx["n"].to_numpy(np.int64)
    ref = ray.put((big_idx, big_n, ctx_idx, ctx_n, vocab))

    def score(t: pa.Table) -> pa.Table:
        big_idx_, big_n_, ctx_idx_, ctx_n_, v = ray.get(ref)
        texts = t.column("text").to_pylist()
        w1, w2, starts, lens, keep = _flatten(texts)
        if len(keep) == 0:
            return pa.table({"doc_id": pa.array([], type=pa.int64()),
                             "n_tokens": pa.array([], type=pa.int64()),
                             "score_milli": pa.array([], type=pa.int64())})
        bi = big_idx_.get_indexer(pd.Index(w1 + SEP + w2))
        bn = np.where(bi >= 0, big_n_[bi], 0)
        ci = ctx_idx_.get_indexer(pd.Index(w1))
        cn = np.where(ci >= 0, ctx_n_[ci], 0)
        lp = np.log(bn + 1.0) - np.log(cn + np.float64(v))
        sums = np.add.reduceat(lp, starts)
        milli = np.floor(1000.0 * sums / lens).astype(np.int64)
        doc_id = t.column("doc_id").to_numpy().astype(np.int64)[keep]
        return pa.table({"doc_id": pa.array(doc_id),
                         "n_tokens": pa.array(lens),
                         "score_milli": pa.array(milli)})

    out = (ds.map_batches(score, batch_format="pyarrow")
           .sort("doc_id").to_pandas())
    return out.astype({"doc_id": "int64", "n_tokens": "int64",
                       "score_milli": "int64"})


def bm25_scores(sf_dir: str, topn: int = 20, k1: float = 1.2,
                b: float = 0.75) -> pd.DataFrame:
    """BM25 retrieval scoring (Robertson & Zaragoza 2009 — public
    formula) of every document against a deterministic query: the
    distinct tokens of the lowest-doc_id document. Top-``topn`` docs by
    score (floor'd milli-nats; ties break on doc_id).

    Distributed shape: corpus statistics (N, total tokens, per-term
    document frequencies) come from ONE stats pass that emits a single
    fixed-width partial row per block (int64 counters — order-free
    merge on the driver); the scoring pass is pure map-side with the
    (tiny) stats broadcast, then a global top-k. The float math
    (idf · tf saturation) is per-doc from identical integers on both
    sides, so the independent golden matches exactly."""
    import pyarrow.parquet as pq_
    import ray

    q_tbl = pq_.read_table(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text"],
                           filters=[("doc_id", "=", 0)])
    q_terms = np.asarray(sorted(set(q_tbl.column("text")[0].as_py()
                                    .split())), dtype=object)
    nq = len(q_terms)
    q_index = pd.Index(q_terms)

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "text"])

    def stats(t: pa.Table) -> pa.Table:
        texts = t.column("text").to_pylist()
        df = np.zeros(nq, dtype=np.int64)
        n_toks = 0
        for s in texts:
            toks = s.split()
            n_toks += len(toks)
            hit = q_index.get_indexer(pd.Index(set(toks)))
            df[hit[hit >= 0]] += 1
        return pa.table({"n_docs": pa.array([len(texts)]),
                         "n_toks": pa.array([n_toks]),
                         "df": pa.array([df.tobytes()],
                                        type=pa.binary())})

    part = ds.map_batches(stats, batch_format="pyarrow").to_pandas()
    n_docs = int(part["n_docs"].sum())
    n_toks = int(part["n_toks"].sum())
    df = np.zeros(nq, dtype=np.int64)
    for bbytes in part["df"]:
        df += np.frombuffer(bbytes, dtype=np.int64)
    avgdl = np.float64(n_toks) / np.float64(n_docs)
    idf = np.log((np.float64(n_docs) - df + 0.5) / (df + 0.5) + 1.0)
    ref = ray.put((idf, avgdl))

    def score(t: pa.Table) -> pa.Table:
        idf_, avgdl_ = ray.get(ref)
        texts = t.column("text").to_pylist()
        out = np.empty(len(texts), dtype=np.int64)
        for i, s in enumerate(texts):
            toks = np.asarray(s.split(), dtype=object)
            dl = np.float64(len(toks))
            if len(toks) == 0:
                out[i] = 0
                continue
            ti = q_index.get_indexer(pd.Index(toks))
            tf = np.bincount(ti[ti >= 0], minlength=nq).astype(np.float64)
            sat = tf * (k1 + 1.0) / (tf + k1 * (1.0 - b + b * dl / avgdl_))
            out[i] = np.int64(np.floor(np.dot(idf_, sat) * 1000.0))
        return pa.table({
            "doc_id": pa.array(t.column("doc_id").to_numpy()
                               .astype(np.int64)),
            "score_milli": pa.array(out)})

    local = ds.map_batches(score, batch_format="pyarrow").to_pandas()
    out = (local.sort_values(["score_milli", "doc_id"],
                             ascending=[False, True], kind="mergesort")
           .head(topn).reset_index(drop=True))
    return out.astype({"doc_id": "int64", "score_milli": "int64"})


def docs_compression_ratio(sf_dir: str) -> pd.DataFrame:
    """Compression-ratio quality signal (used by FineWeb/Gopher-family
    curation recipes: highly repetitive or templated text compresses
    far below natural prose): per doc, ``len(zlib(text)) / len(text)``
    in milli units, plus both byte counts. Pure map-side (one pass, no
    exchange); zlib level 6 is pinned so the independent golden (same
    zlib, same level) matches bit-exactly. At 100 TB this is a
    task-pool ``map_batches`` directly after a pruned read — the
    canonical cheap-quality-gate shape."""
    import zlib

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "text"])

    def ratio(t: pa.Table) -> pa.Table:
        texts = t.column("text").to_pylist()
        raw = np.fromiter((len(s.encode("utf-8")) for s in texts),
                          dtype=np.int64, count=len(texts))
        comp = np.fromiter(
            (len(zlib.compress(s.encode("utf-8"), 6)) for s in texts),
            dtype=np.int64, count=len(texts))
        milli = np.where(raw > 0, comp * 1000 // np.maximum(raw, 1), 0)
        return pa.table({
            "doc_id": pa.array(t.column("doc_id").to_numpy()
                               .astype(np.int64)),
            "n_bytes": pa.array(raw),
            "n_bytes_zlib": pa.array(comp),
            "ratio_milli": pa.array(milli.astype(np.int64))})

    out = (ds.map_batches(ratio, batch_format="pyarrow")
           .sort("doc_id").to_pandas())
    return out.astype({c: "int64" for c in out.columns})
