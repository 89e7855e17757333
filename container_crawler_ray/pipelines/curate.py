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


def curate_pack(sf_dir: str, budget: int = 2048,
                part_size: int = 256,
                jaccard_tau: float = 0.5) -> pd.DataFrame:
    """The full curation composition a training run consumes: quality
    gate → near-dup removal (group representatives) → sequence packing
    of the surviving docs. The survivor id set is dimension-sized
    relative to the corpus (it is one int per KEPT doc), so it
    broadcasts (``ray.put``) into a vectorized ``searchsorted``
    membership filter; packing then runs partition-local exactly like
    ``spans.pack_sequences``. Output: (doc_id, seq_id, seq_off,
    n_chars) for curated docs only."""
    import numpy as np
    import ray

    keep = np.sort(curate_dedup(sf_dir, jaccard_tau=jaccard_tau)
                   ["keep_id"].to_numpy().astype(np.int64))
    keep_ref = ray.put(keep)

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "n_chars"])

    def tag(t: pa.Table) -> pa.Table:
        ks = ray.get(keep_ref)
        ids = t.column("doc_id").to_numpy().astype(np.int64)
        pos = np.clip(np.searchsorted(ks, ids), 0, max(0, len(ks) - 1))
        m = (len(ks) > 0) & (ks[pos] == ids)
        t = t.filter(pa.array(m))
        block = t.column("doc_id").to_numpy() // part_size
        return t.append_column("block", pa.array(block.astype(np.int64)))

    def pack(g: pd.DataFrame) -> pd.DataFrame:
        import numpy as np
        g = g.sort_values("doc_id", kind="mergesort")
        n = g["n_chars"].to_numpy()
        seq = np.empty(len(n), dtype=np.int64)
        off = np.empty(len(n), dtype=np.int64)
        cur_seq, cur_off = 0, 0
        for i, ln in enumerate(n):      # bounded by part_size
            if cur_off > 0 and cur_off + ln > budget:
                cur_seq += 1
                cur_off = 0
            seq[i] = cur_seq
            off[i] = cur_off
            cur_off += ln
        base = int(g["block"].iloc[0]) << 20
        return pd.DataFrame({"doc_id": g["doc_id"].to_numpy(),
                             "seq_id": base + seq, "seq_off": off,
                             "n_chars": n})

    out = (ds.map_batches(tag, batch_format="pyarrow")
           .groupby("block").map_groups(pack, batch_format="pandas")
           .to_pandas())
    return out.astype({"seq_id": "int64", "seq_off": "int64",
                       "n_chars": "int64"})


def write_curated(sf_dir: str, out_dir: str, budget: int = 2048,
                  part_size: int = 256,
                  jaccard_tau: float = 0.5) -> pd.DataFrame:
    """Resumable partitioned output for the curation pipeline: each
    id-block writes its own ``block_NNNNNN.parquet`` atomically
    (tmp + rename) INSIDE the pack task, and blocks whose file already
    exists are skipped before any work runs — a failed run re-executes
    only the missing blocks (the batch analog of the crawl engine's
    idempotent per-pass fragment commits; never one giant file).
    Returns the manifest (block, n_docs, n_seqs, path, skipped)."""
    import os

    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray

    os.makedirs(out_dir, exist_ok=True)
    done = {f for f in os.listdir(out_dir) if f.endswith(".parquet")}
    done_ref = ray.put(done)

    keep = np.sort(curate_dedup(sf_dir, jaccard_tau=jaccard_tau)
                   ["keep_id"].to_numpy().astype(np.int64))
    keep_ref = ray.put(keep)
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "text", "n_chars"])

    def tag(t: pa.Table) -> pa.Table:
        ks = ray.get(keep_ref)
        ids = t.column("doc_id").to_numpy().astype(np.int64)
        pos = np.clip(np.searchsorted(ks, ids), 0, max(0, len(ks) - 1))
        m = (len(ks) > 0) & (ks[pos] == ids)
        t = t.filter(pa.array(m))
        block = t.column("doc_id").to_numpy() // part_size
        return t.append_column("block", pa.array(block.astype(np.int64)))

    def pack_and_write(g: pd.DataFrame) -> pd.DataFrame:
        block = int(g["block"].iloc[0])
        fname = f"block_{block:06d}.parquet"
        path = os.path.join(out_dir, fname)
        if fname in ray.get(done_ref):
            return pd.DataFrame({"block": [block], "n_docs": [len(g)],
                                 "n_seqs": [-1], "path": [path],
                                 "skipped": [True]})
        g = g.sort_values("doc_id", kind="mergesort")
        n = g["n_chars"].to_numpy()
        seq = np.empty(len(n), dtype=np.int64)
        off = np.empty(len(n), dtype=np.int64)
        cur_seq, cur_off = 0, 0
        for i, ln in enumerate(n):
            if cur_off > 0 and cur_off + ln > budget:
                cur_seq += 1
                cur_off = 0
            seq[i] = cur_seq
            off[i] = cur_off
            cur_off += ln
        out = pa.table({
            "doc_id": pa.array(g["doc_id"].to_numpy()),
            "seq_id": pa.array((block << 20) + seq),
            "seq_off": pa.array(off),
            "text": pa.array(g["text"].tolist(), type=pa.string()),
        })
        tmp = path + ".tmp"
        pq.write_table(out, tmp)
        os.replace(tmp, path)
        return pd.DataFrame({"block": [block], "n_docs": [len(g)],
                             "n_seqs": [int(seq[-1]) + 1], "path": [path],
                             "skipped": [False]})

    manifest = (ds.map_batches(tag, batch_format="pyarrow")
                .groupby("block").map_groups(pack_and_write,
                                             batch_format="pandas")
                .to_pandas())
    return manifest.sort_values("block").reset_index(drop=True)


def decontaminate_docs(sf_dir: str, k: int = 3,
                       benchmark_max_id: int = 20) -> pd.DataFrame:
    """Benchmark decontamination: flag training documents that share any
    k-token window with a benchmark/eval set, so they can be dropped
    before training. The benchmark side is eval-set-sized (tiny next to
    the corpus), so its window-hash set broadcasts once (``ray.put``)
    and each batch checks membership with one sorted ``np.searchsorted``
    — no shuffle at all; the corpus streams through a single map stage.
    Here the 'benchmark' is the docs with ``doc_id < benchmark_max_id``
    (stand-in for an external eval file). Benchmark docs themselves are
    excluded from the output. Output: (doc_id, n_windows,
    n_contaminated) for every non-benchmark doc with >= 1 window."""
    import numpy as np
    import ray

    from ..functions.hashing import hash64_many

    import pyarrow.parquet as pq

    bench = pq.read_table(f"{sf_dir}/documents.parquet",
                          columns=["doc_id", "text"],
                          filters=[("doc_id", "<", benchmark_max_id)])
    bw = set()
    for text in bench.column("text").to_pylist():
        toks = text.split()
        wins = [" ".join(toks[i:i + k]) for i in range(len(toks) - k + 1)]
        if wins:
            bw.update(hash64_many(wins).tolist())
    bench_hashes = np.sort(np.fromiter(bw, dtype=np.uint64, count=len(bw)))
    bench_ref = ray.put(bench_hashes)

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "text"])

    def score(t: pa.Table) -> pa.Table:
        bh = ray.get(bench_ref)
        ids, n_w, n_c = [], [], []
        for doc_id, text in zip(t.column("doc_id").to_pylist(),
                                t.column("text").to_pylist()):
            if doc_id < benchmark_max_id:
                continue
            toks = text.split()
            wins = [" ".join(toks[i:i + k])
                    for i in range(len(toks) - k + 1)]
            if not wins:
                continue
            hv = hash64_many(wins)
            pos = np.clip(np.searchsorted(bh, hv), 0, max(0, len(bh) - 1))
            hits = int(((len(bh) > 0) & (bh[pos] == hv)).sum())
            ids.append(doc_id)
            n_w.append(len(wins))
            n_c.append(hits)
        import numpy as _np
        return pa.table({
            "doc_id": pa.array(_np.array(ids, dtype=_np.int64)),
            "n_windows": pa.array(_np.array(n_w, dtype=_np.int64)),
            "n_contaminated": pa.array(_np.array(n_c, dtype=_np.int64)),
        })

    return ds.map_batches(score, batch_format="pyarrow").to_pandas()
