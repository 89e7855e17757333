"""Deduplication operators for a training-data pipeline (graft additions
beyond the reference — SURVEY.md §2.7 notes the reference has none):

- exact dedup → analytics.dedup_exact (groupby content, keep first)
- MinHash + LSH near-dup (shingle → minhash sketch per batch → band
  explode → groupby(band) buckets → verified Jaccard pairs → connected
  components by iterative min-label propagation)
- SimHash (64-bit, vectorized hamming buckets)
- n-gram Jaccard top pairs (exact, SQL-checkable)
- embedding-cosine near-dup pairs (SQL-checkable via list_cosine_similarity)

Scale notes live on each op: the LSH band groupby is the only all-to-all
exchange and moves one (band, hash, doc) row per band per doc, never the
text itself.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data
from ray.data.aggregate import Count, Sum

from ..functions.hashing import mix64

NUM_PERM = 64
BANDS = 16
ROWS_PER_BAND = NUM_PERM // BANDS
_P61 = np.uint64((1 << 61) - 1)


def _word_shingles(text: str, k: int) -> np.ndarray:
    from ..functions.hashing import hash64

    toks = text.split()
    if len(toks) < k:
        return (np.array([hash64(" ".join(toks))], dtype=np.uint64)
                if toks else np.array([], dtype=np.uint64))
    return np.unique(np.fromiter(
        (hash64(" ".join(toks[i:i + k])) for i in range(len(toks) - k + 1)),
        dtype=np.uint64, count=len(toks) - k + 1))


class MinHashStage:
    """Per-batch minhash sketches. The permutation coefficients are fixed
    derived constants (once per actor) — universal hashing
    h_i(x) = (a_i * x + b_i) mod (2^61-1)."""

    def __init__(self, k: int = 3):
        self.k = k
        rng = np.random.RandomState(42)
        self.a = rng.randint(1, (1 << 61) - 1, size=NUM_PERM).astype(np.uint64)
        self.b = rng.randint(0, (1 << 61) - 1, size=NUM_PERM).astype(np.uint64)

    def sketch(self, sh: np.ndarray) -> np.ndarray:
        if len(sh) == 0:
            return np.full(NUM_PERM, np.iinfo(np.uint64).max, dtype=np.uint64)
        with np.errstate(over="ignore"):
            hv = (sh[None, :] * self.a[:, None] + self.b[:, None]) % _P61
        return hv.min(axis=1)

    def __call__(self, t: pa.Table) -> pa.Table:
        doc_ids = t.column("doc_id").to_pylist()
        texts = t.column("text").to_pylist()
        rows_doc, rows_band, rows_hash = [], [], []
        for doc_id, text in zip(doc_ids, texts):
            mh = self.sketch(_word_shingles(text, self.k))
            bands = mh.reshape(BANDS, ROWS_PER_BAND)
            with np.errstate(over="ignore"):
                bh = mix64(bands[:, 0].copy())
                for j in range(1, ROWS_PER_BAND):
                    bh = mix64(bh ^ bands[:, j])
            for b in range(BANDS):
                rows_doc.append(doc_id)
                rows_band.append(b)
                rows_hash.append(int(bh[b]))
        return pa.table(
            {
                "doc_id": pa.array(rows_doc, type=pa.int64()),
                "band": pa.array(rows_band, type=pa.int32()),
                "band_hash": pa.array(np.array(rows_hash, dtype=np.uint64)),
            }
        )


def minhash_lsh_groups(sf_dir: str, k: int = 3, jaccard_tau: float = 0.5,
                       max_rounds: int = 8) -> pd.DataFrame:
    """Near-dup groups: (doc_id, group_id) where group_id = min doc_id of
    the connected component over verified candidate pairs.

    Candidate pairs come from LSH band buckets; verification recomputes
    exact shingle Jaccard for each candidate pair (pair list is small —
    the pairwise step never touches non-colliding docs). Components by
    union-find over the verified pair list on the driver; at 10^10 scale
    this becomes iterative min-label propagation (groupby rounds), which
    the same pair list feeds."""
    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                                 columns=["doc_id", "text"])
    bands = docs.map_batches(MinHashStage, fn_constructor_kwargs={"k": k},
                             batch_format="pyarrow", concurrency=2,
                             num_cpus=0.5)

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        ids = sorted(g["doc_id"].unique().tolist())
        out_a, out_b = [], []
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                out_a.append(ids[i])
                out_b.append(ids[j])
        return pd.DataFrame({"a": out_a, "b": out_b})

    pairs = bands.groupby(["band", "band_hash"]).map_groups(
        bucket_pairs, batch_format="pandas").to_pandas()
    pairs = pairs.drop_duplicates()
    if len(pairs) == 0:
        ids = docs.to_pandas()["doc_id"]
        return pd.DataFrame({"doc_id": ids, "group_id": ids})

    # verify candidates with exact jaccard (broadcast the candidate doc
    # texts only — bounded by the collision set)
    cand_ids = sorted(set(pairs["a"]) | set(pairs["b"]))
    texts = {
        r["doc_id"]: r["text"]
        for r in ray.data.read_parquet(
            f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
        ).map_batches(
            lambda t: t.filter(
                pa.compute.is_in(t.column("doc_id"),
                                 value_set=pa.array(cand_ids))),
            batch_format="pyarrow",
        ).to_pandas().to_dict("records")
    }
    sh = {i: set(_word_shingles(texts[i], k).tolist()) for i in cand_ids}
    verified = []
    for a, b in zip(pairs["a"], pairs["b"]):
        inter = len(sh[a] & sh[b])
        union = len(sh[a] | sh[b])
        if union and inter / union >= jaccard_tau:
            verified.append((a, b))

    parent: dict[int, int] = {}

    def find(x):
        while parent.get(x, x) != x:
            parent[x] = parent.get(parent[x], parent[x])
            x = parent[x]
        return x

    for a, b in verified:
        ra, rb = find(a), find(b)
        if ra != rb:
            lo, hi = min(ra, rb), max(ra, rb)
            parent[hi] = lo
    all_ids = docs.to_pandas()["doc_id"].tolist()
    return pd.DataFrame({"doc_id": all_ids,
                         "group_id": [find(i) for i in all_ids]})


class SimHashStage:
    """64-bit SimHash over word unigrams (vectorized bit-vote)."""

    def __init__(self):
        self._weights = np.arange(64, dtype=np.uint64)

    def __call__(self, t: pa.Table) -> pa.Table:
        from ..functions.hashing import hash64

        texts = t.column("text").to_pylist()
        out = np.zeros(len(texts), dtype=np.uint64)
        for i, s in enumerate(texts):
            toks = s.split()
            if not toks:
                continue
            hv = np.fromiter((hash64(w) for w in toks), dtype=np.uint64,
                             count=len(toks))
            bits = ((hv[:, None] >> self._weights[None, :])
                    & np.uint64(1)).astype(np.int64)
            votes = bits.sum(axis=0) * 2 - len(toks)
            sim = np.uint64(0)
            for b in range(64):
                if votes[b] > 0:
                    sim |= np.uint64(1) << np.uint64(b)
            out[i] = sim
        return pa.table({"doc_id": t.column("doc_id"),
                         "simhash": pa.array(out)})


def simhash_docs(sf_dir: str) -> pd.DataFrame:
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "text"])
    return ds.map_batches(SimHashStage, batch_format="pyarrow",
                          concurrency=2, num_cpus=0.5).to_pandas()


def ngram_top_pairs(sf_dir: str, k: int = 3, topn: int = 20) -> pd.DataFrame:
    """Exact n-gram Jaccard similarity, top-N pairs — fully SQL-checkable
    (distinct word k-gram shingles; inter/union as BIGINTs; jaccard in
    basis points so the comparison is integer-exact).

    Shape: explode (doc_id, shingle) → groupby(shingle) pair expansion →
    groupby(pair) count = intersection → join shingle counts (broadcast).
    """
    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                                 columns=["doc_id", "text"])

    def explode(t: pa.Table) -> pa.Table:
        ids, shingles = [], []
        for doc_id, text in zip(t.column("doc_id").to_pylist(),
                                t.column("text").to_pylist()):
            toks = text.split()
            ss = {" ".join(toks[i:i + k]) for i in range(len(toks) - k + 1)}
            ids.extend([doc_id] * len(ss))
            shingles.extend(sorted(ss))
        return pa.table({"doc_id": pa.array(ids, type=pa.int64()),
                         "shingle": pa.array(shingles, type=pa.string())})

    sh = docs.map_batches(explode, batch_format="pyarrow").materialize()
    sizes = sh.groupby("doc_id").aggregate(
        Count(alias_name="n_shingles")).to_pandas()
    size_map = dict(zip(sizes["doc_id"], sizes["n_shingles"]))

    # hash-partition shingles into a bounded number of buckets and do a
    # vectorized self-merge per bucket (equal shingles always co-bucket) —
    # per-group overhead of one task per *shingle* would dominate otherwise
    def bucketize(t: pa.Table) -> pa.Table:
        from ..functions.hashing import hash64_many
        b = (hash64_many(t.column("shingle").to_pylist())
             % np.uint64(256)).astype(np.int32)
        return t.append_column("bucket", pa.array(b))

    def bucket_pair_counts(g: pd.DataFrame) -> pd.DataFrame:
        m = g[["shingle", "doc_id"]].merge(g[["shingle", "doc_id"]],
                                           on="shingle")
        m = m[m["doc_id_x"] < m["doc_id_y"]]
        out = m.groupby(["doc_id_x", "doc_id_y"]).size().reset_index(
            name="inter_part")
        out = out.rename(columns={"doc_id_x": "a", "doc_id_y": "b"})
        # single int64 pair key: the second shuffle groups on this (Ray's
        # multi-key aggregate over millions of tiny groups is far slower
        # than bucketed map_groups with a vectorized pandas reduce)
        out["pbucket"] = ((out["a"] * 1000003 + out["b"]) % 64).astype("int32")
        return out

    def reduce_bucket(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby(["a", "b"], as_index=False)["inter_part"].sum()
        return out.rename(columns={"inter_part": "inter"})

    pair_counts = (
        sh.map_batches(bucketize, batch_format="pyarrow")
        .groupby("bucket").map_groups(bucket_pair_counts,
                                      batch_format="pandas")
        .groupby("pbucket").map_groups(reduce_bucket, batch_format="pandas")
        .to_pandas()
    )
    if len(pair_counts) == 0:
        return pd.DataFrame({"a": [], "b": [], "inter": [], "union_n": [],
                             "jaccard_bp": []}).astype(
            {"a": "int64", "b": "int64", "inter": "int64",
             "union_n": "int64", "jaccard_bp": "int64"})
    pair_counts["union_n"] = [
        size_map[a] + size_map[b] - i
        for a, b, i in zip(pair_counts["a"], pair_counts["b"],
                           pair_counts["inter"])
    ]
    pair_counts["jaccard_bp"] = (
        pair_counts["inter"] * 10000 // pair_counts["union_n"]).astype("int64")
    pair_counts = pair_counts.sort_values(
        ["jaccard_bp", "a", "b"], ascending=[False, True, True]).head(topn)
    return pair_counts.reset_index(drop=True).astype(
        {"a": "int64", "b": "int64", "inter": "int64", "union_n": "int64"})


def embedding_dup_pairs(sf_dir: str, tau_bp: int = 4000) -> pd.DataFrame:
    """Embedding-cosine near-dup pairs (a < b, sim >= tau). Cosine in
    float64 on both sides; similarity reported in basis points
    (floor(sim*10000)) for integer-exact oracle comparison.

    Ray shape: the (small) full matrix is broadcast once via ray.put;
    each batch computes its block of the similarity matrix with one
    numpy matmul — at scale this becomes block × block tiling with the
    same kernel."""
    import pyarrow.parquet as pq
    import ray

    tbl = pq.read_table(f"{sf_dir}/embeddings.parquet",
                        columns=["vec_id", "embedding"])
    ids = np.asarray(tbl.column("vec_id").to_pylist(), dtype=np.int64)
    mat = np.array(tbl.column("embedding").to_pylist(), dtype=np.float64)
    norms = np.linalg.norm(mat, axis=1)
    norms[norms == 0] = 1.0
    matn = mat / norms[:, None]
    ref = ray.put((ids, matn))

    class BlockSim:
        def __init__(self, ref, tau_bp):
            self.ids, self.matn = ray.get(ref)
            self.tau_bp = tau_bp

        def __call__(self, t: pa.Table) -> pa.Table:
            bids = np.asarray(t.column("vec_id").to_pylist(), dtype=np.int64)
            bm = np.array(t.column("embedding").to_pylist(), dtype=np.float64)
            bn = np.linalg.norm(bm, axis=1)
            bn[bn == 0] = 1.0
            bm = bm / bn[:, None]
            sims = bm @ self.matn.T
            bp = np.floor(sims * 10000).astype(np.int64)
            ai, bj = np.nonzero(bp >= self.tau_bp)
            a = bids[ai]
            b = self.ids[bj]
            keep = a < b
            return pa.table({"a": pa.array(a[keep]),
                             "b": pa.array(b[keep]),
                             "sim_bp": pa.array(bp[ai[keep], bj[keep]])})

    ds = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet",
                               columns=["vec_id", "embedding"])
    out = ds.map_batches(BlockSim, fn_constructor_args=(ref, tau_bp),
                         batch_format="pyarrow", concurrency=2,
                         num_cpus=0.5).to_pandas()
    return out.sort_values(["a", "b"]).reset_index(drop=True)
