"""Approximate-nearest-neighbor search over the ``embeddings`` table.

Two paths (SURVEY-mandated similarity-search component):

- ``knn_bruteforce``: exact cosine top-k — broadcast the (small) query
  matrix via ``ray.put`` once, one numpy matmul per batch against it,
  per-batch local top-k, tiny final merge. This is the correctness
  baseline and the SQL-checkable entry.
- ``knn_lsh``: the scale path — random-hyperplane LSH buckets
  (signature = sign pattern of H projections); probe only same-bucket
  (plus multiprobe flip-1) candidates. Recall measured against the
  brute-force baseline in tests.

Similarity math is float64 end-to-end; reported as basis points
(floor(sim*10000)) for integer-exact oracle comparison.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import ray
import ray.data


def _load_queries(sf_dir: str, n_queries: int):
    tbl = pq.read_table(f"{sf_dir}/embeddings.parquet",
                        columns=["vec_id", "embedding"])
    ids = np.asarray(tbl.column("vec_id").to_pylist(), dtype=np.int64)
    mat = np.array(tbl.column("embedding").to_pylist(), dtype=np.float64)
    sel = ids < n_queries
    q = mat[sel]
    qn = np.linalg.norm(q, axis=1)
    qn[qn == 0] = 1.0
    return ids[sel], q / qn[:, None]


class BruteForceKNN:
    """Per-batch scoring stage: batch block × broadcast query matrix."""

    def __init__(self, qref, k: int):
        self.qids, self.qmat = ray.get(qref)
        self.k = k

    def __call__(self, t: pa.Table) -> pa.Table:
        ids = np.asarray(t.column("vec_id").to_pylist(), dtype=np.int64)
        m = np.array(t.column("embedding").to_pylist(), dtype=np.float64)
        n = np.linalg.norm(m, axis=1)
        n[n == 0] = 1.0
        m = m / n[:, None]
        sims = self.qmat @ m.T                      # (Q, batch)
        rows = {"query_id": [], "neighbor_id": [], "sim_bp": []}
        k = min(self.k, sims.shape[1])
        bp_all = np.floor(sims * 10000).astype(np.int64)
        for qi in range(sims.shape[0]):
            mask = ids != self.qids[qi]             # exclude self
            cand = np.flatnonzero(mask)
            if len(cand) == 0:
                continue
            # local top-k in the SAME order as the global merge and the
            # SQL oracle (sim_bp desc, neighbor_id asc) so boundary ties
            # are pruned identically
            bp = bp_all[qi][cand]
            order = np.lexsort((ids[cand], -bp))[:k]
            top = cand[order]
            rows["query_id"].extend([int(self.qids[qi])] * len(top))
            rows["neighbor_id"].extend(ids[top].tolist())
            rows["sim_bp"].extend(bp_all[qi][top].tolist())
        return pa.table({k2: pa.array(v, type=pa.int64())
                         for k2, v in rows.items()})


def knn_bruteforce(sf_dir: str, n_queries: int = 10, k: int = 5) -> pd.DataFrame:
    qids, qmat = _load_queries(sf_dir, n_queries)
    qref = ray.put((qids, qmat))
    ds = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet",
                               columns=["vec_id", "embedding"])
    local = ds.map_batches(BruteForceKNN, fn_constructor_args=(qref, k),
                           batch_format="pyarrow", concurrency=2,
                           num_cpus=0.5).to_pandas()
    # final merge: global top-k per query with deterministic tie-break
    out = (local.sort_values(["query_id", "sim_bp", "neighbor_id"],
                             ascending=[True, False, True])
           .groupby("query_id", as_index=False).head(k))
    return out.reset_index(drop=True)


def knn_lsh(sf_dir: str, n_queries: int = 10, k: int = 5,
            n_planes: int = 5, max_flips: int = 3) -> pd.DataFrame:
    """LSH-bucketed ANN: bucket = sign-pattern of ``n_planes`` fixed random
    hyperplanes; multiprobe up to ``max_flips`` bit flips. The probed
    fraction of space is C(n_planes, ≤max_flips)/2^n_planes — the
    recall/cost dial (near-uniform vectors need generous multiprobe;
    clustered real embeddings can run far fewer probes)."""
    from itertools import combinations

    rng = np.random.RandomState(42)
    qids, qmat = _load_queries(sf_dir, n_queries)
    dim = qmat.shape[1]
    planes = rng.randn(n_planes, dim)

    def signature(m: np.ndarray) -> np.ndarray:
        return ((m @ planes.T) > 0).astype(np.uint32) @ (
            1 << np.arange(n_planes, dtype=np.uint32))

    qsig = signature(qmat)
    flip_masks = [0] + [
        sum(1 << b for b in combo)
        for r in range(1, max_flips + 1)
        for combo in combinations(range(n_planes), r)
    ]
    probe: dict[int, set[int]] = {}
    for qi, s in enumerate(qsig):
        for m_ in flip_masks:
            probe.setdefault(int(s) ^ m_, set()).add(qi)
    qref = ray.put((qids, qmat, probe))

    class LSHKNN:
        def __init__(self, ref, k):
            self.qids, self.qmat, self.probe = ray.get(ref)
            self.k = k

        def __call__(self, t: pa.Table) -> pa.Table:
            ids = np.asarray(t.column("vec_id").to_pylist(), dtype=np.int64)
            m = np.array(t.column("embedding").to_pylist(), dtype=np.float64)
            n = np.linalg.norm(m, axis=1)
            n[n == 0] = 1.0
            m = m / n[:, None]
            sig = signature(m)
            rows = {"query_id": [], "neighbor_id": [], "sim_bp": []}
            # invert: for each vector, which queries probe its bucket
            for vi in range(len(ids)):
                for qi in self.probe.get(int(sig[vi]), ()):
                    if ids[vi] == self.qids[qi]:
                        continue
                    s = float(self.qmat[qi] @ m[vi])
                    rows["query_id"].append(int(self.qids[qi]))
                    rows["neighbor_id"].append(int(ids[vi]))
                    rows["sim_bp"].append(int(np.floor(s * 10000)))
            return pa.table({k2: pa.array(v, type=pa.int64())
                             for k2, v in rows.items()})

    ds = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet",
                               columns=["vec_id", "embedding"])
    local = ds.map_batches(LSHKNN, fn_constructor_args=(qref, k),
                           batch_format="pyarrow", concurrency=2,
                           num_cpus=0.5).to_pandas()
    out = (local.sort_values(["query_id", "sim_bp", "neighbor_id"],
                             ascending=[True, False, True])
           .groupby("query_id", as_index=False).head(k))
    return out.reset_index(drop=True)


def _kmeans(mat: np.ndarray, k: int, iters: int = 8,
            seed: int = 42) -> np.ndarray:
    """Deterministic Lloyd k-means (numpy) for the IVF coarse quantizer.
    Runs on the driver over a sample — at scale this trains on
    ds.random_sample() and broadcasts the centroid matrix."""
    rng = np.random.RandomState(seed)
    cent = mat[rng.choice(len(mat), size=min(k, len(mat)), replace=False)]
    for _ in range(iters):
        d = ((mat[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
        assign = d.argmin(axis=1)
        for c in range(len(cent)):
            m = assign == c
            if m.any():
                cent[c] = mat[m].mean(axis=0)
    return cent


def knn_ivf(sf_dir: str, n_queries: int = 10, k: int = 5,
            n_lists: int = 16, nprobe: int = 6) -> pd.DataFrame:
    """IVF ANN: vectors bucketed by nearest of ``n_lists`` k-means
    centroids (broadcast); each query scores only vectors in its
    ``nprobe`` nearest lists. Same output shape/ordering as the
    brute-force baseline; recall measured in tests."""
    tbl = pq.read_table(f"{sf_dir}/embeddings.parquet",
                        columns=["vec_id", "embedding"])
    full = np.array(tbl.column("embedding").to_pylist(), dtype=np.float64)
    cent = _kmeans(full, n_lists)
    centn = cent / np.maximum(np.linalg.norm(cent, axis=1), 1e-12)[:, None]
    qids, qmat = _load_queries(sf_dir, n_queries)
    # query → probe lists (by centroid cosine)
    qc = qmat @ centn.T
    probe_lists = np.argsort(-qc, axis=1)[:, :nprobe]
    probe_of_list: dict[int, list[int]] = {}
    for qi, lists in enumerate(probe_lists):
        for li in lists:
            probe_of_list.setdefault(int(li), []).append(qi)
    ref = ray.put((qids, qmat, centn, probe_of_list))

    class IVFKNN:
        def __init__(self, ref, k):
            self.qids, self.qmat, self.centn, self.probe = ray.get(ref)
            self.k = k

        def __call__(self, t: pa.Table) -> pa.Table:
            ids = np.asarray(t.column("vec_id").to_pylist(), dtype=np.int64)
            m = np.array(t.column("embedding").to_pylist(), dtype=np.float64)
            n = np.linalg.norm(m, axis=1)
            n[n == 0] = 1.0
            m = m / n[:, None]
            lists = (m @ self.centn.T).argmax(axis=1)
            rows = {"query_id": [], "neighbor_id": [], "sim_bp": []}
            for li, qis in self.probe.items():
                vm = lists == li
                if not vm.any():
                    continue
                sub_ids = ids[vm]
                sims = self.qmat[qis] @ m[vm].T
                bp = np.floor(sims * 10000).astype(np.int64)
                for row_i, qi in enumerate(qis):
                    keep = sub_ids != self.qids[qi]
                    rows["query_id"].extend(
                        [int(self.qids[qi])] * int(keep.sum()))
                    rows["neighbor_id"].extend(sub_ids[keep].tolist())
                    rows["sim_bp"].extend(bp[row_i][keep].tolist())
            return pa.table({k2: pa.array(v, type=pa.int64())
                             for k2, v in rows.items()})

    ds = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet",
                               columns=["vec_id", "embedding"])
    local = ds.map_batches(IVFKNN, fn_constructor_args=(ref, k),
                           batch_format="pyarrow", concurrency=2,
                           num_cpus=0.5).to_pandas()
    out = (local.sort_values(["query_id", "sim_bp", "neighbor_id"],
                             ascending=[True, False, True])
           .groupby("query_id", as_index=False).head(k))
    return out.reset_index(drop=True)
