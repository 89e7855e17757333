"""Golden-file oracles for the queries whose semantics are not
SQL-expressible (LSH/IVF probing, minhash grouping, heuristic text
analysis, the stateful crawl).

Each golden is produced by an INDEPENDENT single-process implementation —
plain Python/numpy loops, no Ray, no imports of the pipeline modules — so
a bug in the distributed machinery (shuffles, broadcasts, label
propagation, actor pools) cannot hide in shared code. Shared with the
engine are only the "world" constants (md5-based hash64 / mix64 /
canonicalize / synthetic seed generator), mirroring tests/oracle.py's
shared-world-independent-engine rule.

Usage:  python tools/make_goldens.py [sf_dir] [out_dir]
Defaults: /root/testdata/sf0.01 → tests/golden/ (the driver's oracle
scale). The DuckDB twins in __ray_entry__.oracle_sql() read these files
with read_parquet(); the driver compares them value-exact against the
live Ray pipelines.
"""

from __future__ import annotations

import hashlib
import os
import re
import sys

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

MASK64 = (1 << 64) - 1


def hash64(s: str | bytes) -> int:
    if isinstance(s, str):
        s = s.encode("utf-8")
    return int.from_bytes(hashlib.md5(s).digest()[:8], "big")


def mix64(x: int) -> int:
    x &= MASK64
    x ^= x >> 30
    x = (x * 0xBF58476D1CE4E5B9) & MASK64
    x ^= x >> 27
    x = (x * 0x94D049BB133111EB) & MASK64
    x ^= x >> 31
    return x


def _docs(sf_dir: str) -> pd.DataFrame:
    return pq.read_table(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"]).to_pandas()


def _embs(sf_dir: str):
    t = pq.read_table(f"{sf_dir}/embeddings.parquet",
                      columns=["vec_id", "embedding"])
    ids = t.column("vec_id").to_numpy().astype(np.int64)
    mat = np.array(t.column("embedding").to_pylist(), dtype=np.float64)
    n = np.linalg.norm(mat, axis=1)
    n[n == 0] = 1.0
    return ids, mat / n[:, None]


# ----------------------------------------------------------------- simhash
def g_simhash(sf_dir: str) -> pd.DataFrame:
    rows = []
    for _, r in _docs(sf_dir).iterrows():
        toks = r["text"].split()
        sim = 0
        if toks:
            votes = [0] * 64
            for w in toks:
                h = hash64(w)
                for b in range(64):
                    votes[b] += 1 if (h >> b) & 1 else -1
            for b in range(64):
                if votes[b] > 0:
                    sim |= 1 << b
        rows.append({"doc_id": int(r["doc_id"]), "simhash": sim})
    df = pd.DataFrame(rows)
    df["simhash"] = df["simhash"].astype(np.uint64)
    return df


def _popcount64(x: np.ndarray) -> np.ndarray:
    """SWAR popcount over a uint64 array — deliberately a DIFFERENT
    algorithm from the engine's np.unpackbits path."""
    x = x - ((x >> np.uint64(1)) & np.uint64(0x5555555555555555))
    x = ((x & np.uint64(0x3333333333333333))
         + ((x >> np.uint64(2)) & np.uint64(0x3333333333333333)))
    x = (x + (x >> np.uint64(4))) & np.uint64(0x0F0F0F0F0F0F0F0F)
    return ((x * np.uint64(0x0101010101010101)) >> np.uint64(56)).astype(
        np.int64)


def g_simhash_pairs(sf_dir: str, max_hamming: int = 3) -> pd.DataFrame:
    """ALL pairs with Hamming(simhash) <= max_hamming by brute-force
    O(n^2) scan (chunked) — no banding, so it independently checks the
    engine's pigeonhole-banding claim of exactness."""
    sims = g_simhash(sf_dir).sort_values("doc_id")   # index order == id
    ids = sims["doc_id"].to_numpy()                  # order, so the a<b
    hs = sims["simhash"].to_numpy().astype(np.uint64)  # triangle is by id
    n = len(ids)
    rows_a, rows_b, rows_h = [], [], []
    for s in range(0, n, 256):
        e = min(n, s + 256)
        x = np.bitwise_xor(hs[s:e, None], hs[None, :])
        ham = _popcount64(x.ravel()).reshape(e - s, n)
        ai, bi = np.nonzero(ham <= max_hamming)
        keep = (s + ai) < bi          # upper triangle only, a < b
        rows_a.append(ids[s + ai[keep]])
        rows_b.append(ids[bi[keep]])
        rows_h.append(ham[ai[keep], bi[keep]])
    df = pd.DataFrame({"a": np.concatenate(rows_a),
                       "b": np.concatenate(rows_b),
                       "hamming": np.concatenate(rows_h)})
    df = df.sort_values(["a", "b"]).reset_index(drop=True)
    return df.astype({"a": "int64", "b": "int64", "hamming": "int64"})


# ----------------------------------------------------------- text analysis
_STOPS = {
    "en": {"the", "and", "of", "to", "a", "in", "is", "it", "that"},
    "de": {"der", "die", "das", "und", "ist", "nicht", "ein", "zu"},
    "fr": {"le", "la", "et", "les", "des", "est", "un", "une"},
    "es": {"el", "la", "y", "los", "las", "es", "un", "una", "de"},
    "zh": set(),
}
_FP_BASE = 1099511628211


def _g_lang(s: str) -> str:
    if any("一" <= c <= "鿿" for c in s[:200]):
        return "zh"
    toks = [w.lower() for w in s.split()[:80]]
    best, best_n = "en", -1
    for lang, stops in _STOPS.items():
        if not stops:
            continue
        n = sum(1 for w in toks if w in stops)
        if n > best_n:
            best, best_n = lang, n
    return best


def _g_quality(s: str) -> float:
    toks = s.split()
    n = len(toks)
    if n == 0:
        return 0.0
    all_stops = set().union(*_STOPS.values())
    stop_ratio = sum(1 for w in toks if w.lower() in all_stops) / n
    upper_ratio = sum(1 for c in s if c.isupper()) / max(1, len(s))
    mean_len = sum(len(w) for w in toks) / n
    len_score = min(1.0, n / 50.0)
    word_score = 1.0 if 3.0 <= mean_len <= 10.0 else 0.5
    return (0.4 * len_score + 0.3 * min(1.0, stop_ratio * 4)
            + 0.2 * word_score + 0.1 * (1.0 - min(1.0, upper_ratio * 5)))


def _g_winnow(s: str, k: int = 8, w: int = 16) -> int:
    b = s.encode("utf-8")
    if len(b) < k:
        return len(b)
    n = len(b) - k + 1
    hs = []
    for i in range(n):
        h = 0
        for j in range(k):
            h = (h * _FP_BASE + b[i + j]) & MASK64
        hs.append(h)
    if n <= w:
        return min(hs)
    mins = [min(hs[i:i + w]) for i in range(n - w + 1)]
    out = 0
    for v in sorted(set(mins)):
        out ^= v
    return out


def g_text_analysis(sf_dir: str) -> pd.DataFrame:
    rows = []
    for _, r in _docs(sf_dir).iterrows():
        s = r["text"]
        rows.append({
            "doc_id": int(r["doc_id"]),
            "lang_pred": _g_lang(s),
            "quality_milli": int(np.floor(np.float64(_g_quality(s)) * 1000)),
            "fingerprint": _g_winnow(s),
        })
    df = pd.DataFrame(rows)
    df["quality_milli"] = df["quality_milli"].astype(np.int64)
    df["fingerprint"] = df["fingerprint"].astype(np.uint64)
    return df


# ------------------------------------------------------------ minhash/LSH
NUM_PERM, BANDS = 64, 16
ROWS_PER_BAND = NUM_PERM // BANDS
_P61 = (1 << 61) - 1


def _g_shingles(text: str, k: int = 3) -> set[int]:
    toks = text.split()
    if len(toks) < k:
        return {hash64(" ".join(toks))} if toks else set()
    return {hash64(" ".join(toks[i:i + k])) for i in range(len(toks) - k + 1)}


def _g_minhash_groups(sf_dir: str, k: int = 3,
                      tau: float = 0.5) -> pd.DataFrame:
    rng = np.random.RandomState(42)
    A = rng.randint(1, (1 << 61) - 1, size=NUM_PERM).astype(np.uint64).tolist()
    B = rng.randint(0, (1 << 61) - 1, size=NUM_PERM).astype(np.uint64).tolist()
    docs = _docs(sf_dir)
    sh_of: dict[int, set[int]] = {}
    buckets: dict[tuple[int, int], list[int]] = {}
    for _, r in docs.iterrows():
        did = int(r["doc_id"])
        sh = _g_shingles(r["text"], k)
        sh_of[did] = sh
        if sh:
            sketch = [min(((a * x + b) % _P61) & MASK64 for x in sh)
                      for a, b in zip(A, B)]
        else:
            sketch = [MASK64] * NUM_PERM
        for band in range(BANDS):
            bh = mix64(sketch[band * ROWS_PER_BAND])
            for j in range(1, ROWS_PER_BAND):
                bh = mix64(bh ^ sketch[band * ROWS_PER_BAND + j])
            buckets.setdefault((band, bh), []).append(did)
    pairs = set()
    for ids in buckets.values():
        ids = sorted(set(ids))
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                pairs.add((ids[i], ids[j]))
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        while parent.get(x, x) != x:
            parent[x] = parent.get(parent[x], parent[x])
            x = parent[x]
        return x

    for a, b in sorted(pairs):
        sa, sb = sh_of[a], sh_of[b]
        u = len(sa | sb)
        if u and len(sa & sb) / u >= tau:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
    all_ids = sorted(int(d) for d in docs["doc_id"])
    return pd.DataFrame({"doc_id": np.array(all_ids, dtype=np.int64),
                         "group_id": np.array([find(i) for i in all_ids],
                                              dtype=np.int64)})


def g_minhash(sf_dir: str) -> pd.DataFrame:
    return _g_minhash_groups(sf_dir)


def g_curate_dedup(sf_dir: str) -> pd.DataFrame:
    docs = _docs(sf_dir)
    tok_re = re.compile(r"\S+")
    punct_re = re.compile(r"[.!?,;:]")
    kept = {
        int(r["doc_id"]) for _, r in docs.iterrows()
        if len(tok_re.findall(r["text"])) >= 10
        and len(punct_re.findall(r["text"])) <= 40
    }
    groups = _g_minhash_groups(sf_dir)
    groups = groups[groups["doc_id"].isin(kept)]
    reps = groups.groupby("group_id", as_index=False)["doc_id"].min()
    out = reps.rename(columns={"doc_id": "keep_id"}).sort_values("keep_id")
    return out.reset_index(drop=True).astype(
        {"group_id": "int64", "keep_id": "int64"})


def g_embedding_groups(sf_dir: str, tau_bp: int = 4000) -> pd.DataFrame:
    """Union-find over a brute-force cosine matrix — independent of the
    engine's tiled pair generation AND its label propagation."""
    ids, mat = _embs(sf_dir)
    bp = np.floor((mat @ mat.T) * 10000).astype(np.int64)
    ai, bi = np.nonzero(bp >= tau_bp)
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        while parent.get(x, x) != x:
            parent[x] = parent.get(parent[x], parent[x])
            x = parent[x]
        return x

    for i, j in zip(ai, bi):
        if i >= j:
            continue
        a, b = int(ids[i]), int(ids[j])
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    out_ids = np.sort(ids)
    return pd.DataFrame({
        "vec_id": out_ids.astype(np.int64),
        "group_id": np.array([find(int(v)) for v in out_ids],
                             dtype=np.int64)})


# ------------------------------------------------------------------- knn
def _g_topk(hits: list[tuple[int, int, int]], k: int = 5) -> pd.DataFrame:
    df = pd.DataFrame(hits, columns=["query_id", "neighbor_id", "sim_bp"])
    df = df.sort_values(["query_id", "sim_bp", "neighbor_id"],
                        ascending=[True, False, True])
    df = df.groupby("query_id", as_index=False).head(k)
    return df.reset_index(drop=True).astype("int64")


def g_knn_lsh(sf_dir: str, n_queries: int = 10, k: int = 5,
              n_planes: int = 5, max_flips: int = 3) -> pd.DataFrame:
    from itertools import combinations

    ids, mat = _embs(sf_dir)
    planes = np.random.RandomState(42).randn(n_planes, mat.shape[1])
    sig = ((mat @ planes.T) > 0).astype(np.uint32) @ (
        1 << np.arange(n_planes, dtype=np.uint32))
    qm = ids < n_queries
    flips = [0] + [sum(1 << b for b in c)
                   for r in range(1, max_flips + 1)
                   for c in combinations(range(n_planes), r)]
    hits = []
    for qi in np.flatnonzero(qm):
        qid = int(ids[qi])
        probe = {int(sig[qi]) ^ m for m in flips}
        for vi in range(len(ids)):
            if ids[vi] == qid or int(sig[vi]) not in probe:
                continue
            bp = int(np.floor(float(mat[qi] @ mat[vi]) * 10000))
            hits.append((qid, int(ids[vi]), bp))
    return _g_topk(hits, k)


def g_knn_ivf(sf_dir: str, n_queries: int = 10, k: int = 5,
              n_lists: int = 16, nprobe: int = 8) -> pd.DataFrame:
    t = pq.read_table(f"{sf_dir}/embeddings.parquet",
                      columns=["vec_id", "embedding"])
    ids = t.column("vec_id").to_numpy().astype(np.int64)
    raw = np.array(t.column("embedding").to_pylist(), dtype=np.float64)
    # deterministic hash sample (gap from total row count), as specified
    total = len(ids)
    gap = max(1, total // 4096)
    keep = np.array([mix64(int(i)) % gap == 0
                     for i in ids.astype(np.uint64)])
    sample = raw[keep]
    rng = np.random.RandomState(42)
    cent = sample[rng.choice(len(sample), size=min(n_lists, len(sample)),
                             replace=False)]
    for _ in range(8):
        d = ((sample[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
        assign = d.argmin(axis=1)
        for c in range(len(cent)):
            m = assign == c
            if m.any():
                cent[c] = sample[m].mean(axis=0)
    cn = np.linalg.norm(cent, axis=1)
    cn[cn == 0] = 1.0
    centn = cent / cn[:, None]
    n = np.linalg.norm(raw, axis=1)
    n[n == 0] = 1.0
    mat = raw / n[:, None]
    lists = (mat @ centn.T).argmax(axis=1)
    qm = ids < n_queries
    hits = []
    for qi in np.flatnonzero(qm):
        qid = int(ids[qi])
        probes = set(np.argsort(-(mat[qi] @ centn.T))[:nprobe].tolist())
        for vi in range(len(ids)):
            if ids[vi] == qid or int(lists[vi]) not in probes:
                continue
            bp = int(np.floor(float(mat[qi] @ mat[vi]) * 10000))
            hits.append((qid, int(ids[vi]), bp))
    return _g_topk(hits, k)


def _g_pack_frame(t: pd.DataFrame, budget: int,
                  part_size: int) -> pd.DataFrame:
    t = t.sort_values("doc_id").reset_index(drop=True)
    rows = []
    for _, r in t.iterrows():
        did, ln = int(r["doc_id"]), int(r["n_chars"])
        rows.append((did // part_size, did, ln))
    out = []
    cur_block, cur_seq, cur_off = None, 0, 0
    for block, did, ln in rows:
        if block != cur_block:
            cur_block, cur_seq, cur_off = block, 0, 0
        if cur_off > 0 and cur_off + ln > budget:
            cur_seq += 1
            cur_off = 0
        out.append({"doc_id": did, "seq_id": (block << 20) + cur_seq,
                    "seq_off": cur_off, "n_chars": ln})
        cur_off += ln
    return pd.DataFrame(out).astype(
        {"doc_id": "int64", "seq_id": "int64", "seq_off": "int64",
         "n_chars": "int64"})


def g_pack_sequences(sf_dir: str, budget: int = 2048,
                     part_size: int = 256) -> pd.DataFrame:
    """Straight-line greedy packer over id-blocks (mirrors the operator
    spec; independent of the Ray grouping machinery)."""
    t = pq.read_table(f"{sf_dir}/documents.parquet",
                      columns=["doc_id", "n_chars"]).to_pandas()
    return _g_pack_frame(t, budget, part_size)


def g_curate_pack(sf_dir: str, budget: int = 2048,
                  part_size: int = 256) -> pd.DataFrame:
    """Gate + dedup survivors (g_curate_dedup) packed by the
    straight-line packer."""
    keep = set(g_curate_dedup(sf_dir)["keep_id"])
    t = pq.read_table(f"{sf_dir}/documents.parquet",
                      columns=["doc_id", "n_chars"]).to_pandas()
    t = t[t["doc_id"].isin(keep)]
    return _g_pack_frame(t, budget, part_size)


def g_users_hll(sf_dir: str, p: int = 12) -> pd.DataFrame:
    """Pure-Python HyperLogLog (int bit-twiddling, per-row loop) —
    independent of the engine's vectorized register math but using the
    shared-world mix64 hash, so registers and estimate match exactly."""
    import math

    m = 1 << p
    alpha = 0.7213 / (1 + 1.079 / m)
    t = pq.read_table(f"{sf_dir}/events.parquet",
                      columns=["event_type", "user_id"]).to_pandas()
    regs: dict[str, list[int]] = {}
    for _, r in t.iterrows():
        ty = r["event_type"]
        reg = regs.setdefault(ty, [0] * m)
        h = mix64(int(r["user_id"]))
        idx = h >> (64 - p)
        tail = ((h << p) | ((1 << p) - 1)) & MASK64
        rank = (64 - tail.bit_length()) + 1
        if rank > reg[idx]:
            reg[idx] = rank
    rows = []
    for ty in sorted(regs):
        reg = regs[ty]
        e = alpha * m * m / sum(2.0 ** -v for v in reg)
        zeros = reg.count(0)
        if e <= 2.5 * m and zeros:
            e = m * math.log(m / zeros)
        rows.append({"event_type": ty, "n_users_approx": int(e)})
    return pd.DataFrame(rows).astype({"n_users_approx": "int64"})



def g_interleaved_pack(sf_dir: str, budget: int = 2048,
                       part_size: int = 256,
                       media_cost: int = 16) -> pd.DataFrame:
    """Straight-line interleaved span-assemble + md5 media stub + greedy
    block-local pack (independent of the engine's vectorized path)."""
    import hashlib

    t = pq.read_table(f"{sf_dir}/documents.parquet",
                      columns=["doc_id", "text"]).to_pandas()
    t = t.sort_values("doc_id")
    rows = []
    for _, r in t.iterrows():
        did = int(r["doc_id"])
        toks = r["text"].split()
        n_media = 0
        n_chars = 0
        sig = 0
        for i, w in enumerate(toks):
            if i % 4 == 3:
                n_media += 1
                h = int.from_bytes(
                    hashlib.md5(f"m://{did}/{i}".encode()).digest()[:8],
                    "big")
                sig ^= h
            else:
                n_chars += len(w)
        rows.append({"doc_id": did, "n_spans": len(toks),
                     "n_media": n_media, "n_text_chars": n_chars,
                     "cost": n_chars + media_cost * n_media,
                     "media_sig": sig - (1 << 64) if sig >= (1 << 63)
                     else sig,
                     "block": did // part_size})
    df = pd.DataFrame(rows)
    out = []
    for blk, g in df.groupby("block"):
        cur_seq, cur_off = 0, 0
        acc: dict[int, dict] = {}
        for _, r in g.sort_values("doc_id").iterrows():
            c = int(r["cost"])
            if cur_off > 0 and cur_off + c > budget:
                cur_seq += 1
                cur_off = 0
            sid = (int(blk) << 20) + cur_seq
            a = acc.setdefault(sid, {"seq_id": sid, "n_docs": 0,
                                     "n_spans": 0, "n_media": 0,
                                     "n_text_chars": 0, "cost": 0,
                                     "media_sig": 0})
            a["n_docs"] += 1
            a["n_spans"] += int(r["n_spans"])
            a["n_media"] += int(r["n_media"])
            a["n_text_chars"] += int(r["n_text_chars"])
            a["cost"] += c
            a["media_sig"] ^= int(r["media_sig"]) & ((1 << 64) - 1)
            cur_off += c
        for a in acc.values():
            s = a["media_sig"]
            a["media_sig"] = s - (1 << 64) if s >= (1 << 63) else s
            out.append(a)
    cols = ["seq_id", "n_docs", "n_spans", "n_media", "n_text_chars",
            "cost", "media_sig"]
    return pd.DataFrame(out)[cols].astype("int64")



def g_pagerank_parts(sf_dir: str, iters: int = 10,
                     damp_pct: int = 85) -> pd.DataFrame:
    """Straight-line integer PageRank over the consecutive-lineitem
    part graph (dict loops, no numpy vector path)."""
    li = pq.read_table(f"{sf_dir}/lineitem.parquet",
                       columns=["l_orderkey", "l_linenumber",
                                "l_partkey"]).to_pandas()
    # l_partkey tiebreak: (orderkey, linenumber) is not unique; the
    # engine, this golden and the triangle-count SQL twin all use the
    # same total order so the edge set is well-defined
    li = li.sort_values(["l_orderkey", "l_linenumber", "l_partkey"])
    edges: dict[tuple[int, int], int] = {}
    prev_o, prev_p = None, None
    for o, p in zip(li["l_orderkey"], li["l_partkey"]):
        o, p = int(o), int(p)
        if o == prev_o:
            edges[(prev_p, p)] = edges.get((prev_p, p), 0) + 1
        prev_o, prev_p = o, p
    out_w: dict[int, int] = {}
    for (s, _d), w in edges.items():
        out_w[s] = out_w.get(s, 0) + w
    parts = sorted(int(x) for x in pq.read_table(
        f"{sf_dir}/part.parquet", columns=["p_partkey"])
        .column("p_partkey").to_pylist())
    ranks = {p: 1_000_000 for p in parts}
    teleport = (100 - damp_pct) * 10_000
    for _ in range(iters):
        nxt = {p: teleport for p in parts}
        for (s, d), w in edges.items():
            nxt[d] += (ranks[s] * damp_pct // 100) * w // out_w[s]
        ranks = nxt
    return pd.DataFrame({"p_partkey": parts,
                         "rank_ppm": [ranks[p] for p in parts]}
                        ).astype("int64")


# --------------------------------------------------- frontier host stats
def g_frontier_host_stats(sf_dir: str) -> pd.DataFrame:
    from container_crawler_ray.sources.synth import make_seed_urls

    meta = pq.ParquetFile(f"{sf_dir}/documents.parquet").metadata
    n = max(200, min(2000, meta.num_rows))
    urls = make_seed_urls(n, n_hosts=50)   # shared world generator
    stats: dict[str, list] = {}
    for u in urls:
        # canonicalize independently: lower scheme/host, strip :80/:443 and
        # fragment (mirrors functions/canonicalize.py's documented rules)
        m = re.match(r"(?i)^(https?)://([^/#?]+)(.*)$", u)
        scheme, host, rest = m.group(1).lower(), m.group(2).lower(), m.group(3)
        host = re.sub(r":(80|443)$", "", host)
        rest = rest.split("#", 1)[0] or "/"
        # replicate the engine's float32 arithmetic exactly (note: numpy
        # SCALAR * python-int promotes to float64, arrays do not — force
        # float32 on both operands to match the engine's array math)
        p32 = np.float32(hash64(u) % 1000) / np.float32(1000.0)
        pr_milli = int(np.int64(p32 * np.float32(1000.0)))
        s = stats.setdefault(host, [0, -1, 1 << 30])
        s[0] += 1
        s[1] = max(s[1], pr_milli)
        s[2] = min(s[2], 0)            # seed depth is always 0
    rows = [{"host": h, "n_urls": v[0], "max_priority_milli": v[1],
             "min_depth": v[2]} for h, v in stats.items()]
    df = pd.DataFrame(rows).sort_values("host").reset_index(drop=True)
    return df.astype({"n_urls": "int64", "max_priority_milli": "int64",
                      "min_depth": "int64"})


# ------------------------------------------------------- crawl pass docs
def g_crawl_pass_docs(sf_dir: str) -> pd.DataFrame:
    sys.path.insert(0, os.path.join(REPO, "tests"))
    from oracle import run_oracle

    from container_crawler_ray.config import CrawlConfig
    from container_crawler_ray.sources.synth import make_seed_urls

    meta = pq.ParquetFile(f"{sf_dir}/documents.parquet").metadata
    n = max(200, min(2000, meta.num_rows))
    cfg = CrawlConfig(num_partitions=8, items_chunk=400, workers=2,
                      seen_shards=4, n_hosts=50, n_paths=max(200, n // 2),
                      pass_time_ms=2000)
    st = run_oracle(cfg, make_seed_urls(n, n_hosts=50), max_passes=2)
    rows = [{"doc_id": d["doc_id"], "url": d["url"], "host": d["host"],
             "pass_id": d["pass_id"], "n_spans": len(d["spans"])}
            for d in st.docs]
    df = pd.DataFrame(rows).sort_values(
        ["pass_id", "host", "url"]).reset_index(drop=True)
    return df.astype({"pass_id": "int64", "n_spans": "int64"})


def g_token_freq_cms(sf_dir: str, depth: int = 4,
                     width: int = 2048) -> pd.DataFrame:
    """Independent Count-Min build: one global dict-of-cells sketch from
    exact token counts (integer adds commute, so this equals the
    engine's per-block-then-merge path bit-exactly), then min-over-rows
    estimates for the probe set (tokens of every 199th doc)."""
    from collections import Counter

    docs = _docs(sf_dir)
    true = Counter()
    probe: set[str] = set()
    for doc_id, text in zip(docs["doc_id"], docs["text"]):
        toks = text.split()
        true.update(toks)
        if int(doc_id) % 199 == 0:
            probe.update(toks)

    sk = np.zeros((depth, width), dtype=np.int64)
    cols: dict[str, list[int]] = {}
    for tok, n in true.items():
        h = hash64(tok)
        cc = []
        for r in range(depth):
            h = mix64(h)
            c = h % width
            sk[r, c] += n
            cc.append(c)
        cols[tok] = cc

    toks = sorted(probe)
    est = [min(sk[r, cols[t][r]] for r in range(depth)) for t in toks]
    return pd.DataFrame({"tok": toks,
                         "est_n": np.array(est, dtype=np.int64)})


def g_lm_bigram_scores(sf_dir: str) -> pd.DataFrame:
    """Independent bigram-LM scorer: dict-count training over the whole
    corpus (integer adds — order-free, so it equals the engine's
    per-block-partials + groupby-sum path exactly), then per-doc mean
    add-one log-prob. Per-doc sums use ``np.add.reduceat`` over a
    GLOBAL concatenation — reduceat sums each segment independently and
    sequentially, so per-doc float rounding matches the engine's
    per-block concatenation bit-for-bit."""
    from collections import Counter

    docs = _docs(sf_dir).sort_values("doc_id")
    BOS = "\x02"

    big = Counter()
    kept_ids, all_w1, all_w2, lens = [], [], [], []
    for doc_id, text in zip(docs["doc_id"], docs["text"]):
        toks = text.split()
        if not toks:
            continue
        w1 = [BOS] + toks[:-1]
        big.update(zip(w1, toks))
        kept_ids.append(int(doc_id))
        all_w1.extend(w1)
        all_w2.extend(toks)
        lens.append(len(toks))

    ctx = Counter()
    vocab = set()
    for (a, b), n in big.items():
        ctx[a] += n
        vocab.add(b)
    v = float(len(vocab))

    bn = np.array([big[(a, b)] for a, b in zip(all_w1, all_w2)],
                  dtype=np.int64)
    cn = np.array([ctx[a] for a in all_w1], dtype=np.int64)
    lp = np.log(bn + 1.0) - np.log(cn + v)
    lens = np.array(lens, dtype=np.int64)
    starts = np.concatenate(([0], np.cumsum(lens)[:-1]))
    sums = np.add.reduceat(lp, starts)
    milli = np.floor(1000.0 * sums / lens).astype(np.int64)
    return pd.DataFrame({"doc_id": np.array(kept_ids, dtype=np.int64),
                         "n_tokens": lens, "score_milli": milli})


def _g_norm(m: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(m, axis=1)
    norms[norms == 0] = 1.0
    return m / norms[:, None]


def _g_emb_matrix(sf_dir: str):
    t = pq.read_table(f"{sf_dir}/embeddings.parquet",
                      columns=["vec_id", "embedding"])
    ids = t.column("vec_id").to_numpy().astype(np.int64)
    mat = np.stack([np.asarray(v, dtype=np.float32)
                    for v in t.column("embedding").to_pylist()]
                   ).astype(np.float64)
    return ids, mat


def _g_lloyd(sf_dir: str, k: int = 16, iters: int = 5):
    """Independent spherical Lloyd mirroring the engine's determinism
    contract: selection init (k smallest mix64(vec_id)), 2^-20
    fixed-point integer centroid sums (order-free, so this global
    single-process build equals the engine's per-block partial +
    groupby reduce), renormalize each round."""
    FP = float(1 << 20)
    ids, mat = _g_emb_matrix(sf_dir)
    vn = _g_norm(mat)
    h = np.array([mix64(int(i)) for i in ids], dtype=np.uint64)
    pick = np.lexsort((ids, h))[:k]
    cent = _g_norm(mat[pick].copy())
    for _ in range(iters):
        a = (vn @ cent.T).argmax(axis=1)
        fp = np.floor(vn * FP).astype(np.int64)
        new = cent.copy()
        for c in np.unique(a):
            m = a == c
            s = fp[m].sum(axis=0, dtype=np.int64).astype(np.float64)
            new[int(c)] = s / (float(m.sum()) * FP)
        cent = _g_norm(new)
    return ids, vn, cent


def g_kmeans_clusters(sf_dir: str, k: int = 16,
                      iters: int = 5) -> pd.DataFrame:
    ids, vn, cent = _g_lloyd(sf_dir, k, iters)
    sims = vn @ cent.T
    a = sims.argmax(axis=1)
    bp = np.floor(sims[np.arange(len(a)), a] * 10000).astype(np.int64)
    df = pd.DataFrame({"vec_id": ids, "cluster": a.astype(np.int64),
                       "centroid_sim_bp": bp})
    return df.sort_values("vec_id").reset_index(drop=True)


def g_semantic_dedup(sf_dir: str, tau_bp: int = 4000, k: int = 16,
                     iters: int = 5) -> pd.DataFrame:
    ids, vn, cent = _g_lloyd(sf_dir, k, iters)
    _, mat = _g_emb_matrix(sf_dir)
    a = (vn @ cent.T).argmax(axis=1)
    out = []
    for c in np.unique(a):
        m = np.flatnonzero(a == c)
        m = m[np.argsort(ids[m])]
        sub = _g_norm(mat[m].copy())
        bp = np.floor((sub @ sub.T) * 10000).astype(np.int64)
        dup = np.tril(bp >= tau_bp, k=-1).any(axis=1)
        out.append(pd.DataFrame({
            "vec_id": ids[m], "cluster": np.full(len(m), c, np.int64),
            "keep": (~dup).astype(np.int64)}))
    df = pd.concat(out, ignore_index=True)
    return df.sort_values("vec_id").reset_index(drop=True)


def g_bm25_scores(sf_dir: str, topn: int = 20, k1: float = 1.2,
                  b: float = 0.75) -> pd.DataFrame:
    """Independent BM25: dict/Counter corpus stats, same float formula
    per doc from identical integers, floor'd milli scores, (score desc,
    doc_id asc) top-n."""
    docs = _docs(sf_dir).sort_values("doc_id").reset_index(drop=True)
    q_terms = np.asarray(
        sorted(set(docs.loc[docs["doc_id"].idxmin(), "text"].split())),
        dtype=object)
    nq = len(q_terms)
    pos = {t: i for i, t in enumerate(q_terms)}

    n_docs = 0
    n_toks = 0
    df = np.zeros(nq, dtype=np.int64)
    toklists = []
    for text in docs["text"]:
        toks = text.split()
        n_docs += 1
        n_toks += len(toks)
        for t in set(toks):
            if t in pos:
                df[pos[t]] += 1
        toklists.append(toks)
    avgdl = np.float64(n_toks) / np.float64(n_docs)
    idf = np.log((np.float64(n_docs) - df + 0.5) / (df + 0.5) + 1.0)

    scores = np.empty(n_docs, dtype=np.int64)
    for i, toks in enumerate(toklists):
        if not toks:
            scores[i] = 0
            continue
        dl = np.float64(len(toks))
        tf = np.zeros(nq, dtype=np.float64)
        for t in toks:
            j = pos.get(t)
            if j is not None:
                tf[j] += 1.0
        sat = tf * (k1 + 1.0) / (tf + k1 * (1.0 - b + b * dl / avgdl))
        scores[i] = np.int64(np.floor(np.dot(idf, sat) * 1000.0))

    out = pd.DataFrame({"doc_id": docs["doc_id"].to_numpy(np.int64),
                        "score_milli": scores})
    out = (out.sort_values(["score_milli", "doc_id"],
                           ascending=[False, True], kind="mergesort")
           .head(topn).reset_index(drop=True))
    return out


def g_strip_dup_windows(sf_dir: str, k: int = 3) -> pd.DataFrame:
    """Independent masking: dict of window-hash → distinct-doc count
    over the whole corpus, then per-doc interval union via a plain
    Python sweep (deliberately NOT the engine's diff-array kernel)."""
    docs = _docs(sf_dir).sort_values("doc_id")
    seen: dict[int, set[int]] = {}
    toks_of = {}
    for doc_id, text in zip(docs["doc_id"], docs["text"]):
        toks = text.split()
        toks_of[int(doc_id)] = toks
        for i in range(max(0, len(toks) - k + 1)):
            h = hash64(" ".join(toks[i:i + k]))
            seen.setdefault(h, set()).add(int(doc_id))
    dup = {h for h, d in seen.items() if len(d) > 1}

    rows = []
    for doc_id in docs["doc_id"]:
        toks = toks_of[int(doc_id)]
        n = len(toks)
        masked = [False] * n
        for i in range(max(0, n - k + 1)):
            if hash64(" ".join(toks[i:i + k])) in dup:
                for j in range(i, min(i + k, n)):
                    masked[j] = True
        spans = sum(1 for j in range(n)
                    if masked[j] and (j == 0 or not masked[j - 1]))
        rows.append({"doc_id": int(doc_id), "n_tokens": n,
                     "n_tokens_kept": n - sum(masked),
                     "n_dup_spans": spans})
    return pd.DataFrame(rows).astype("int64")


def g_part_components(sf_dir: str) -> pd.DataFrame:
    """Independent connected components: same consecutive-lineitem edge
    derivation as g_pagerank_parts, resolved by plain UNION-FIND
    (deliberately a different algorithm from the engine's min-label
    propagation)."""
    li = pq.read_table(f"{sf_dir}/lineitem.parquet",
                       columns=["l_orderkey", "l_linenumber",
                                "l_partkey"]).to_pandas()
    li = li.sort_values(["l_orderkey", "l_linenumber", "l_partkey"])
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a: int, b: int) -> None:
        for v in (a, b):
            parent.setdefault(v, v)
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    prev_o, prev_p = None, None
    for o, p in zip(li["l_orderkey"], li["l_partkey"]):
        o, p = int(o), int(p)
        if o == prev_o:
            union(prev_p, p)
        prev_o, prev_p = o, p

    nodes = sorted(parent)
    comp = {n: find(n) for n in nodes}
    from collections import Counter
    sizes = Counter(comp.values())
    return pd.DataFrame({
        "p_partkey": np.array(nodes, dtype=np.int64),
        "component": np.array([comp[n] for n in nodes], dtype=np.int64),
        "component_size": np.array([sizes[comp[n]] for n in nodes],
                                   dtype=np.int64)})


def g_events_weighted_sample(sf_dir: str, n: int = 100) -> pd.DataFrame:
    """Independent A-ES: same hash-derived uniforms and IEEE pow over
    the WHOLE table at once (the engine merges per-block top-n; pure
    selection, so the results must coincide exactly)."""
    t = pq.read_table(f"{sf_dir}/events.parquet",
                      columns=["event_id", "value"])
    eid = t.column("event_id").to_numpy().astype(np.int64)
    cents = np.floor(t.column("value").to_numpy() * 100).astype(np.int64)
    u_ = np.array([mix64(int(x)) for x in eid], dtype=np.uint64)
    u = (u_.astype(np.float64) + 1.0) / np.float64(2.0 ** 64)
    key = np.power(u, 1.0 / (cents + 1).astype(np.float64))
    order = np.lexsort((eid, -key))[:n]
    return pd.DataFrame({
        "event_id": eid[order],
        "w_cents": cents[order],
        "key_e9": np.floor(key[order] * 1e9).astype(np.int64)})


def g_docs_compression_ratio(sf_dir: str) -> pd.DataFrame:
    """Independent zlib-ratio: plain per-doc loop, same pinned level."""
    import zlib

    docs = _docs(sf_dir).sort_values("doc_id")
    rows = []
    for doc_id, text in zip(docs["doc_id"], docs["text"]):
        b = text.encode("utf-8")
        c = len(zlib.compress(b, 6))
        rows.append({"doc_id": int(doc_id), "n_bytes": len(b),
                     "n_bytes_zlib": c,
                     "ratio_milli": (c * 1000 // len(b)) if b else 0})
    return pd.DataFrame(rows).astype("int64")


def g_events_entropy_per_user(sf_dir: str) -> pd.DataFrame:
    """Independent entropy: Counter counts, identical float64 p·ln p
    terms, per-user reduceat over the global (user, type) order."""
    from collections import Counter

    t = pq.read_table(f"{sf_dir}/events.parquet",
                      columns=["user_id", "event_type"])
    cnt = Counter(zip(t.column("user_id").to_pylist(),
                      t.column("event_type").to_pylist()))
    rows = sorted(cnt.items())
    uid = np.array([u for (u, _), _ in rows], dtype=np.int64)
    c = np.array([n for _, n in rows], dtype=np.int64)
    tot_map = Counter()
    for (u, _), n_ in cnt.items():
        tot_map[u] += n_
    tot = np.array([tot_map[u] for (u, _), _ in rows], dtype=np.int64)
    p = c.astype(np.float64) / tot.astype(np.float64)
    terms = -p * np.log(p)
    starts = np.flatnonzero(np.r_[True, uid[1:] != uid[:-1]])
    return pd.DataFrame({
        "user_id": uid[starts],
        "n_events": np.add.reduceat(c, starts),
        "entropy_milli": np.floor(
            np.add.reduceat(terms, starts) * 1000.0).astype(np.int64)})


def _g_kmeans(mat: np.ndarray, k: int, seed: int = 42,
              iters: int = 8) -> np.ndarray:
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


def g_knn_ivfpq(sf_dir: str, n_queries: int = 10, k: int = 5,
                n_lists: int = 16, nprobe: int = 8,
                m_sub: int = 8, n_codes: int = 16,
                rerank: int = 8) -> pd.DataFrame:
    t = pq.read_table(f"{sf_dir}/embeddings.parquet",
                      columns=["vec_id", "embedding"])
    ids = t.column("vec_id").to_numpy().astype(np.int64)
    raw = np.array(t.column("embedding").to_pylist(), dtype=np.float64)
    gap = max(1, len(ids) // 4096)
    keep = np.array([mix64(int(i)) % gap == 0
                     for i in ids.astype(np.uint64)])
    sample = raw[keep]
    cent = _g_kmeans(sample.copy(), n_lists, seed=42)
    cn = np.linalg.norm(cent, axis=1)
    cn[cn == 0] = 1.0
    centn = cent / cn[:, None]
    sn = np.linalg.norm(sample, axis=1)
    sn[sn == 0] = 1.0
    samplen = sample / sn[:, None]
    d = raw.shape[1]
    dsub = d // m_sub
    books = [_g_kmeans(np.ascontiguousarray(
                 samplen[:, mi * dsub:(mi + 1) * dsub]).copy(),
             n_codes, seed=42 + mi) for mi in range(m_sub)]
    n = np.linalg.norm(raw, axis=1)
    n[n == 0] = 1.0
    mat = raw / n[:, None]
    lists = (mat @ centn.T).argmax(axis=1)
    codes = np.empty((len(ids), m_sub), dtype=np.int64)
    for mi, cb in enumerate(books):
        sub = mat[:, mi * dsub:(mi + 1) * dsub]
        d2 = ((sub[:, None, :] - cb[None, :, :]) ** 2).sum(axis=2)
        codes[:, mi] = d2.argmin(axis=1)
    qm = ids < n_queries
    qids = ids[qm]
    qmat = mat[qm]
    lut = [qmat[:, mi * dsub:(mi + 1) * dsub] @ books[mi].T
           for mi in range(m_sub)]
    qc = qmat @ centn.T
    probe_lists = np.argsort(-qc, axis=1)[:, :nprobe]
    hits = []
    for row_q in range(len(qids)):
        probes = set(probe_lists[row_q].tolist())
        cand = np.flatnonzero(np.isin(lists, list(probes))
                              & (ids != qids[row_q]))
        if not len(cand):
            continue
        scores = np.zeros(len(cand), dtype=np.float64)
        for mi in range(m_sub):
            scores += lut[mi][row_q][codes[cand, mi]]
        bp = np.floor(scores * 10000).astype(np.int64)
        hits.extend((int(qids[row_q]), int(ids[c]), int(b))
                    for c, b in zip(cand, bp))
    shortlist = _g_topk(hits, k * rerank)
    # exact re-rank of the ADC shortlist against the raw (normalized)
    # vectors, as the engine's second candidate-filtered pass does
    row_of = {int(v): i for i, v in enumerate(ids)}
    exact = [(int(q), int(n),
              int(np.floor(float(mat[row_of[int(q)]] @ mat[row_of[int(n)]])
                           * 10000)))
             for q, n in zip(shortlist["query_id"],
                             shortlist["neighbor_id"])]
    return _g_topk(exact, k)


def g_embedding_rp(sf_dir: str, d_out: int = 16) -> pd.DataFrame:
    ids, mat = _embs(sf_dir)
    d_in = mat.shape[1]
    rows_i, rows_d, rows_v = [], [], []
    sign = np.empty((d_in, d_out))
    for i in range(d_in):
        for j in range(d_out):
            sign[i, j] = 1.0 if mix64(i * 1_000_003 + j) & 1 else -1.0
    y = (mat @ sign) / np.sqrt(float(d_out))
    fp = np.floor(y * (1 << 20)).astype(np.int64)
    for r in range(len(ids)):
        for j in range(d_out):
            rows_i.append(int(ids[r])); rows_d.append(j)
            rows_v.append(int(fp[r, j]))
    return pd.DataFrame({"vec_id": np.array(rows_i, dtype=np.int64),
                         "dim": np.array(rows_d, dtype=np.int64),
                         "val_fp": np.array(rows_v, dtype=np.int64)})



def g_bpe_merges(sf_dir: str) -> pd.DataFrame:
    """Straight-line BPE (Sennrich et al. 2016): word-frequency dict by
    plain Python Counter, 12 merge rounds; pair counts include every
    adjacency of the current segmentation; merges apply left-to-right
    non-overlapping; ties break (count desc, left asc, right asc)."""
    from collections import Counter

    docs = _docs(sf_dir)
    wc = Counter()
    for s in docs["text"]:
        wc.update(s.split())
    syms = {w: list(w) for w in wc}
    rules = []
    for rank in range(12):
        pc = Counter()
        for w, c in wc.items():
            s = syms[w]
            for i in range(len(s) - 1):
                pc[(s[i], s[i + 1])] += c
        if not pc:
            break
        top_n = max(pc.values())
        if top_n < 2:
            break
        cands = sorted([k for k, v in pc.items() if v == top_n])
        a, b = cands[0]
        rules.append((rank, a, b, top_n))
        for w in syms:
            s, r, i = syms[w], [], 0
            while i < len(s):
                if i + 1 < len(s) and s[i] == a and s[i + 1] == b:
                    r.append(a + b); i += 2
                else:
                    r.append(s[i]); i += 1
            syms[w] = r
    return pd.DataFrame(rules, columns=["rank", "left", "right", "n"]) \
        .astype({"rank": "int64", "n": "int64"})



def g_events_value_ewma(sf_dir: str) -> pd.DataFrame:
    """Independent integer EWMA: per-user plain Python loop over events
    in (ts, event_id) order, e0 = v0, e = (7*e + v) >> 3 (arithmetic
    shift = floor — identical for negatives in Python and numpy)."""
    t = pq.read_table(f"{sf_dir}/events.parquet",
                      columns=["event_id", "user_id", "ts", "value"])
    df = pd.DataFrame({
        "event_id": t.column("event_id").to_numpy(),
        "user_id": t.column("user_id").to_numpy(),
        "ts_us": t.column("ts").cast("int64").to_numpy(),
        "cents": np.floor(t.column("value").to_numpy() * 100)
        .astype(np.int64)})
    df = df.sort_values(["user_id", "ts_us", "event_id"],
                        kind="mergesort")
    out = {}
    for u, v in zip(df["user_id"].to_numpy(), df["cents"].to_numpy()):
        u = int(u); v = int(v)
        out[u] = v if u not in out else (7 * out[u] + v) >> 3
    rows = sorted(out.items())
    return pd.DataFrame({
        "user_id": np.array([r[0] for r in rows], dtype=np.int64),
        "ewma_cents": np.array([r[1] for r in rows], dtype=np.int64)})




def g_part_kcore(sf_dir: str, k: int = 30) -> pd.DataFrame:
    """Independent k-core: same consecutive-lineitem edge derivation as
    g_part_components, then sequential peeling with a worklist (k-core
    is order-independent, so any peeling order gives the same core)."""
    li = pq.read_table(f"{sf_dir}/lineitem.parquet",
                       columns=["l_orderkey", "l_linenumber",
                                "l_partkey"]).to_pandas()
    li = li.sort_values(["l_orderkey", "l_linenumber", "l_partkey"])
    adj: dict[int, set] = {}
    prev_o, prev_p = None, None
    for o, p in zip(li["l_orderkey"], li["l_partkey"]):
        o, p = int(o), int(p)
        if o == prev_o and p != prev_p:
            adj.setdefault(prev_p, set()).add(p)
            adj.setdefault(p, set()).add(prev_p)
        prev_o, prev_p = o, p
    changed = True
    while changed:
        changed = False
        for n in list(adj):
            if len(adj[n]) < k:
                for m in adj.pop(n):
                    if m in adj:
                        adj[m].discard(n)
                changed = True
    rows = sorted((n, len(s)) for n, s in adj.items())
    return pd.DataFrame({
        "p_partkey": np.array([r[0] for r in rows], dtype=np.int64),
        "core_deg": np.array([r[1] for r in rows], dtype=np.int64)})




def g_embedding_mmr(sf_dir: str, k: int = 20, m_window: int = 256,
                    lam_milli: int = 700) -> pd.DataFrame:
    """MMR spec: candidates = global top m_window by floor(cos*1e4) to
    vec 0 (ties by vec_id), then greedy integer-bp selection."""
    t = pq.read_table(f"{sf_dir}/embeddings.parquet",
                      columns=["vec_id", "embedding"])
    ids = t.column("vec_id").to_numpy().astype(np.int64)
    raw = np.array(t.column("embedding").to_pylist(), dtype=np.float64)
    n = np.linalg.norm(raw, axis=1)
    n[n == 0] = 1.0
    mat = raw / n[:, None]
    q = mat[np.flatnonzero(ids == 0)[0]]
    bp = np.floor((mat @ q) * 10000).astype(np.int64)
    cand = np.flatnonzero(ids != 0)
    order = cand[np.lexsort((ids[cand], -bp[cand]))[:m_window]]
    cids, simq, V = ids[order], bp[order], mat[order]
    P = np.floor((V @ V.T) * 10000).astype(np.int64)
    lam, mu = lam_milli, 1000 - lam_milli
    avail = np.ones(len(cids), dtype=bool)
    maxsel = np.zeros(len(cids), dtype=np.int64)
    rows = []
    for rank in range(1, min(k, len(cids)) + 1):
        score = lam * simq - mu * maxsel
        live = np.flatnonzero(avail)
        best = live[np.lexsort((cids[live], -score[live]))[0]]
        rows.append((rank, int(cids[best]), int(simq[best]),
                     int(score[best])))
        avail[best] = False
        maxsel = np.maximum(maxsel, P[best])
    return pd.DataFrame(rows, columns=["rank", "vec_id", "sim_bp",
                                       "mmr_score"]).astype("int64")




def g_events_voptimal(sf_dir: str, pre_bins: int = 256,
                      k: int = 16) -> pd.DataFrame:
    """Independent straight-line V-optimal DP over the same spec."""
    t = pq.read_table(f"{sf_dir}/events.parquet", columns=["value"])
    cents = np.floor(t.column("value").to_numpy() * 100).astype(np.int64)
    lo, hi = int(cents.min()), int(cents.max())
    width = max(1, (hi - lo + pre_bins) // pre_bins)
    b = np.minimum((cents - lo) // width, pre_bins - 1)
    c = np.bincount(b, minlength=pre_bins).astype(np.int64)
    S = [0] * (pre_bins + 1)
    Q = [0] * (pre_bins + 1)
    for i in range(pre_bins):
        S[i + 1] = S[i] + int(c[i])
        Q[i + 1] = Q[i] + int(c[i]) ** 2

    def cost(a, bb):
        L = bb - a
        s = S[bb] - S[a]
        return L * (Q[bb] - Q[a]) - s * s, L

    best = [[(None, None)] * (pre_bins + 1) for _ in range(k + 1)]
    back = [[0] * (pre_bins + 1) for _ in range(k + 1)]
    best[0][0] = (0, 1)
    for j in range(1, k + 1):
        for i in range(j, pre_bins + 1):
            bn = bl = bs = None
            for s_ in range(j - 1, i):
                pn, pl = best[j - 1][s_]
                if pn is None:
                    continue
                cn, cl = cost(s_, i)
                tn, tl = pn * cl + cn * pl, pl * cl
                if bn is None or tn * bl < bn * tl:
                    bn, bl, bs = tn, tl, s_
            if bn is not None:
                best[j][i] = (bn, bl)
                back[j][i] = bs
    bounds = [pre_bins]
    i, j = pre_bins, k
    while j > 0:
        i = back[j][i]
        bounds.append(i)
        j -= 1
    bounds = bounds[::-1]
    rows = []
    for seg in range(k):
        a, bb = bounds[seg], bounds[seg + 1]
        n, L = cost(a, bb)
        rows.append((seg, lo + a * width, lo + bb * width,
                     S[bb] - S[a], (1000 * n) // L))
    return pd.DataFrame(rows, columns=[
        "seg", "lo_cents", "hi_cents", "n_rows", "sse_milli"]) \
        .astype("int64")




def g_events_channel_shapley(sf_dir: str) -> pd.DataFrame:
    """Straight-line Shapley attribution: per-user prefix sets by a
    plain Python scan, exact Fraction arithmetic."""
    from fractions import Fraction
    from math import factorial

    t = pq.read_table(f"{sf_dir}/events.parquet",
                      columns=["user_id", "ts", "event_id",
                               "event_type"])
    df = t.to_pandas()
    df["ts"] = df["ts"].astype("int64")
    df = df.sort_values(["user_id", "ts", "event_id"])
    channels = ("click", "error", "signup", "view")
    bit = {c: 1 << i for i, c in enumerate(channels)}
    conv = [0] * 16
    for _uid, g in df.groupby("user_id", sort=False):
        mask = 0
        converted = 0
        for ty in g["event_type"]:
            if ty == "purchase":
                converted = 1
                break
            mask |= bit.get(ty, 0)
        if not converted:
            mask = 0
            for ty in g["event_type"]:
                mask |= bit.get(ty, 0)
        if converted:
            conv[mask] += 1
    v = list(conv)
    for i in range(4):
        for m in range(16):
            if m & (1 << i):
                v[m] += v[m ^ (1 << i)]
    rows = []
    for i, ch in enumerate(channels):
        phi = Fraction(0)
        for S in range(16):
            if S & (1 << i):
                continue
            s_ = bin(S).count("1")
            w = Fraction(factorial(s_) * factorial(4 - 1 - s_),
                         factorial(4))
            phi += w * (v[S | (1 << i)] - v[S])
        phi6 = phi * 1_000_000
        rows.append((ch, phi6.numerator // phi6.denominator))
    return pd.DataFrame(rows, columns=["event_type", "shapley_micro"]) \
        .sort_values("event_type").reset_index(drop=True) \
        .astype({"shapley_micro": "int64"})


GOLDENS = {
    "simhash_docs": g_simhash,
    "simhash_dup_pairs": g_simhash_pairs,
    "text_analysis": g_text_analysis,
    "minhash_lsh_groups": g_minhash,
    "curate_dedup": g_curate_dedup,
    "embedding_dup_groups": g_embedding_groups,
    "pack_sequences": g_pack_sequences,
    "curate_pack": g_curate_pack,
    "users_per_event_type_hll": g_users_hll,
    "knn_lsh": g_knn_lsh,
    "knn_ivf": g_knn_ivf,
    "knn_ivfpq": g_knn_ivfpq,
    "embedding_rp": g_embedding_rp,
    "interleaved_pack": g_interleaved_pack,
    "pagerank_parts": g_pagerank_parts,
    "frontier_host_stats": g_frontier_host_stats,
    "crawl_pass_docs": g_crawl_pass_docs,
    "token_freq_cms": g_token_freq_cms,
    "lm_bigram_scores": g_lm_bigram_scores,
    "kmeans_clusters": g_kmeans_clusters,
    "semantic_dedup": g_semantic_dedup,
    "bm25_scores": g_bm25_scores,
    "strip_dup_windows": g_strip_dup_windows,
    "part_components": g_part_components,
    "events_weighted_sample": g_events_weighted_sample,
    "docs_compression_ratio": g_docs_compression_ratio,
    "events_entropy_per_user": g_events_entropy_per_user,
    "bpe_merges": g_bpe_merges,
    "events_value_ewma": g_events_value_ewma,
    "part_kcore": g_part_kcore,
    "embedding_mmr_topk": g_embedding_mmr,
    "events_voptimal_histogram": g_events_voptimal,
    "events_channel_shapley": g_events_channel_shapley,
}


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out_dir = sys.argv[2] if len(sys.argv) > 2 else os.path.join(
        REPO, "tests", "golden")
    os.makedirs(out_dir, exist_ok=True)
    for name, fn in GOLDENS.items():
        df = fn(sf_dir)
        path = os.path.join(out_dir, f"{name}.parquet")
        pq.write_table(pa.Table.from_pandas(df, preserve_index=False), path)
        print(f"{name}: {len(df)} rows -> {path}")


if __name__ == "__main__":
    main()
