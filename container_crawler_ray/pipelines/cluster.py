"""Distributed embedding clustering and SemDeDup-style semantic dedup
(Abbas et al. 2023, "SemDeDup" — public paper: k-means-cluster the
embedding space, then remove near-duplicates WITHIN each cluster so the
quadratic similarity work is sharded by cluster instead of all-pairs).

Determinism contract (what lets an independent single-process golden
match bit-for-bit):
- init is pure SELECTION: the k vectors with the smallest
  ``mix64(vec_id)`` (no RNG, no accumulation);
- every cross-row accumulation is an INTEGER sum: per-vector
  components are floored to 2^-20 fixed point before summing, so
  partial sums commute across blocks and merge order;
- all remaining float math (normalize, dot, floor-to-basis-points) is
  per-row with a fixed reduction width (dim=64), identical on both
  sides.

Scale shape: assignment passes are map-only with broadcast centroids;
each Lloyd iteration's exchange moves k rows per block (the fixed-point
partial sums), reduced by a ``groupby(cluster)``; the dedup exchange
hash-partitions the table BY CLUSTER exactly once, so the quadratic
within-cluster similarity never sees more than one cluster per task —
at 100 TB you raise k until the largest cluster fits a worker.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import ray
import ray.data

from ..functions.hashing import mix64
from ..functions.vectors import list_col_to_matrix, normalize_rows

FP = np.int64(1) << np.int64(20)  # fixed-point scale for centroid sums
DIM = 64


def _read_embeddings(sf_dir: str):
    """Row-scaled blocks + ONE materialization: the Lloyd loop and the
    final assignment re-traverse this table ``iters+1`` times, so it is
    pinned in the object store once (spillable) instead of re-read from
    parquet per iteration — the same pattern as pagerank's edge list.
    Every per-block op downstream is a selection or an integer sum, so
    the result is block-split-invariant by construction."""
    path = f"{sf_dir}/embeddings.parquet"
    n = pq.ParquetFile(path).metadata.num_rows
    return ray.data.read_parquet(
        path, columns=["vec_id", "embedding"],
        override_num_blocks=max(2, n // 65536)).materialize()


def _init_centroids(ds, k: int) -> np.ndarray:
    """The k normalized vectors with the smallest ``mix64(vec_id)``
    (ties on vec_id). Each block proposes its local k, the driver picks
    the global k — pure selection, so any block split gives the same
    answer."""
    def cand(t: pa.Table) -> pa.Table:
        ids = t.column("vec_id").to_numpy().astype(np.uint64)
        h = mix64(ids)
        pick = np.lexsort((ids, h))[:k]
        out = t.take(pa.array(pick))
        return out.append_column("h", pa.array(h[pick].astype(np.uint64)))

    local = ds.map_batches(cand, batch_format="pyarrow").to_pandas()
    local = local.sort_values(["h", "vec_id"]).head(k)
    mat = np.stack([np.asarray(v, dtype=np.float32)
                    for v in local["embedding"]]).astype(np.float64)
    return normalize_rows(mat)


def _lloyd(ds, k: int, iters: int) -> np.ndarray:
    """Distributed spherical Lloyd: broadcast centroids, map-side
    assignment + fixed-point partial sums, ``groupby(cluster)`` integer
    reduce, renormalize. Returns the final normalized centroids."""
    cent = _init_centroids(ds, k)

    for _ in range(iters):
        ref = ray.put(cent)

        def partial(t: pa.Table) -> pa.Table:
            cent_ = ray.get(ref)
            vn = normalize_rows(list_col_to_matrix(t.column("embedding")))
            a = (vn @ cent_.T).argmax(axis=1)
            fp = np.floor(vn * np.float64(FP)).astype(np.int64)
            cs, inv = np.unique(a, return_inverse=True)
            sums = np.zeros((len(cs), DIM), dtype=np.int64)
            np.add.at(sums, inv, fp)
            cnt = np.bincount(inv).astype(np.int64)
            return pa.table({
                "c": pa.array(cs.astype(np.int64)),
                "n": pa.array(cnt),
                "s": pa.array([row.tobytes() for row in sums],
                              type=pa.binary())})

        def reduce_c(g: pd.DataFrame) -> pd.DataFrame:
            s = np.zeros(DIM, dtype=np.int64)
            for b in g["s"]:
                s += np.frombuffer(b, dtype=np.int64)
            return pd.DataFrame({"c": g["c"].iloc[:1],
                                 "n": [int(g["n"].sum())],
                                 "s": [s.tobytes()]})

        agg = (ds.map_batches(partial, batch_format="pyarrow")
               .groupby("c").map_groups(reduce_c, batch_format="pandas")
               .to_pandas())
        new = cent.copy()  # empty clusters keep their centroid
        for c, n, sb in zip(agg["c"], agg["n"], agg["s"]):
            s = np.frombuffer(sb, dtype=np.int64).astype(np.float64)
            new[int(c)] = s / (np.float64(n) * np.float64(FP))
        cent = normalize_rows(new)
    return cent


def kmeans_clusters(sf_dir: str, k: int = 16,
                    iters: int = 5) -> pd.DataFrame:
    """Per-vector cluster assignment from ``iters`` rounds of the
    distributed Lloyd above, plus the cosine-to-centroid in basis
    points. Output sorted by vec_id."""
    ds = _read_embeddings(sf_dir)
    cent = _lloyd(ds, k, iters)
    ref = ray.put(cent)

    def assign(t: pa.Table) -> pa.Table:
        cent_ = ray.get(ref)
        ids = t.column("vec_id").to_numpy().astype(np.int64)
        vn = normalize_rows(list_col_to_matrix(t.column("embedding")))
        sims = vn @ cent_.T
        a = sims.argmax(axis=1)
        bp = np.floor(sims[np.arange(len(a)), a] * 10000).astype(np.int64)
        return pa.table({"vec_id": pa.array(ids),
                         "cluster": pa.array(a.astype(np.int64)),
                         "centroid_sim_bp": pa.array(bp)})

    out = (ds.map_batches(assign, batch_format="pyarrow")
           .sort("vec_id").to_pandas())
    return out.astype({"vec_id": "int64", "cluster": "int64",
                       "centroid_sim_bp": "int64"})


def semantic_dedup(sf_dir: str, tau_bp: int = 4000, k: int = 16,
                   iters: int = 5) -> pd.DataFrame:
    """SemDeDup: within each k-means cluster, drop every vector that has
    cosine ≥ ``tau_bp`` basis points with ANY lower-vec_id vector of the
    same cluster (the deterministic leader rule). One
    ``groupby(cluster)`` exchange moves the table; the quadratic
    similarity runs per cluster as a single matmul. Output: every
    vector with its cluster and keep flag, sorted by vec_id."""
    ds = _read_embeddings(sf_dir)
    cent = _lloyd(ds, k, iters)
    ref = ray.put(cent)

    def tag(t: pa.Table) -> pa.Table:
        cent_ = ray.get(ref)
        vn = normalize_rows(list_col_to_matrix(t.column("embedding")))
        a = (vn @ cent_.T).argmax(axis=1)
        return pa.table({
            "vec_id": pa.array(
                t.column("vec_id").to_numpy().astype(np.int64)),
            "cluster": pa.array(a.astype(np.int64)),
            "embedding": t.column("embedding")})

    def dedup_cluster(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("vec_id")
        ids = g["vec_id"].to_numpy(np.int64)
        mat = np.stack([np.asarray(v, dtype=np.float32)
                        for v in g["embedding"]]).astype(np.float64)
        vn = normalize_rows(mat)
        bp = np.floor((vn @ vn.T) * 10000).astype(np.int64)
        dup = (np.tril(bp >= tau_bp, k=-1)).any(axis=1)
        return pd.DataFrame({"vec_id": ids,
                             "cluster": g["cluster"].to_numpy(np.int64),
                             "keep": (~dup).astype(np.int64)})

    out = (ds.map_batches(tag, batch_format="pyarrow")
           .groupby("cluster").map_groups(dedup_cluster,
                                          batch_format="pandas")
           .to_pandas())
    return (out.sort_values("vec_id", kind="mergesort")
            .reset_index(drop=True)
            .astype({"vec_id": "int64", "cluster": "int64",
                     "keep": "int64"}))
