"""Iterative graph algorithms over testdata-derived graphs.

Beyond the label-propagation connected components in ``dedup.py``, this
module adds a power-iteration PageRank — the canonical "iterate until
fixpoint over an edge exchange" shape a data engine needs for link
analysis (host ranking in a crawl frontier is the reference-adjacent
use: rank hosts by who links to whom; here the deterministic stand-in
graph is parts co-occurring consecutively within an order).

Everything is INTEGER arithmetic (ranks in parts-per-million,
contributions via floor division) so the result is bit-exact
reproducible regardless of block order or parallelism — integer sums
are associative/commutative where float sums are not. The golden
oracle is a straight-line single-process reimplementation.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data

from .joins import _read

_BUCKETS = 64


def _build_edges(sf_dir: str):
    """Directed weighted edges (src_part → dst_part): consecutive
    lineitems (by l_linenumber) within the same order contribute one
    unit of weight. One bucketed exchange (``orderkey % 64``); each
    bucket derives its orders' consecutive pairs with vectorized
    shifts and pre-aggregates (src, dst) weights."""
    items = _read(sf_dir, "lineitem",
                  columns=["l_orderkey", "l_linenumber", "l_partkey"])

    def tag(t: pa.Table) -> pa.Table:
        key = t.column("l_orderkey").to_numpy().astype(np.int64)
        return t.append_column(
            "bucket", pa.array((key % _BUCKETS).astype(np.int32)))

    def mk_edges(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["l_orderkey", "l_linenumber"],
                          kind="mergesort")
        ok = g["l_orderkey"].to_numpy(np.int64)
        pk = g["l_partkey"].to_numpy(np.int64)
        same = ok[1:] == ok[:-1]
        e = pd.DataFrame({"src": pk[:-1][same], "dst": pk[1:][same]})
        return (e.groupby(["src", "dst"], as_index=False)
                .size().rename(columns={"size": "w"}))

    def tag_src(t: pa.Table) -> pa.Table:
        src = t.column("src").to_numpy().astype(np.int64)
        return t.append_column(
            "ebucket", pa.array((src % _BUCKETS).astype(np.int32)))

    def merge_edges(g: pd.DataFrame) -> pd.DataFrame:
        return (g.groupby(["src", "dst"], as_index=False)["w"].sum())

    # second bucketed reduce: the SAME (src, dst) pair appears in many
    # order-buckets; contributions use floor division, so weights must
    # be globally aggregated BEFORE the iteration or the per-fragment
    # floors lose 1 ppm each (measured vs the golden).
    return (items.map_batches(tag, batch_format="pyarrow")
            .groupby("bucket").map_groups(mk_edges,
                                          batch_format="pandas")
            .map_batches(tag_src, batch_format="pyarrow")
            .groupby("ebucket").map_groups(merge_edges,
                                           batch_format="pandas")
            .materialize())


def pagerank_parts(sf_dir: str, iters: int = 10,
                   damp_pct: int = 85) -> pd.DataFrame:
    """Integer power-iteration PageRank over the part co-occurrence
    graph. Rank is parts-per-million; each iteration a node u with
    rank r and total out-weight W sends ``(r * damp // 100) * w // W``
    along each out-edge of weight w; a node's new rank is the teleport
    share plus the integer sum of incoming contributions (dangling
    mass is dropped — deterministic and standard).

    Scale shape: edges stay DISTRIBUTED (built once, materialized,
    re-scanned each round); the rank vector is dimension-sized (the
    part catalog — the same class of object every broadcast-LUT join
    in ``joins.py`` ships), broadcast per round via ``ray.put``. Each
    round is one ``map_batches`` over edge blocks emitting per-block
    pre-summed (dst, contribution) partials — the driver reduce is
    |touched parts| × |blocks| rows. At a 10⁹-node catalog the rank
    vector outgrows a broadcast; the fallback is ranks-as-dataset with
    the bucketed co-partition join, same integer semantics.

    Output: (p_partkey, rank_ppm) for every part in the catalog."""
    part = _read(sf_dir, "part", columns=["p_partkey"]).to_pandas()
    pk = np.sort(part["p_partkey"].to_numpy(np.int64))
    n_max = int(pk.max()) + 1

    edges = _build_edges(sf_dir)

    # total out-weight per src (one pass, driver-reduced like the LUTs)
    def out_partial(t: pa.Table) -> pa.Table:
        src = t.column("src").to_numpy().astype(np.int64)
        w = t.column("w").to_numpy().astype(np.int64)
        u, inv = np.unique(src, return_inverse=True)
        return pa.table({"src": pa.array(u),
                         "w": pa.array(np.bincount(inv, weights=w)
                                       .astype(np.int64))})

    ow = (edges.map_batches(out_partial, batch_format="pyarrow")
          .to_pandas().groupby("src", as_index=False)["w"].sum())
    W = np.zeros(n_max, dtype=np.int64)
    W[ow["src"].to_numpy(np.int64)] = ow["w"].to_numpy(np.int64)

    teleport = np.int64((100 - damp_pct) * 10_000)   # ppm
    ranks = np.full(n_max, 1_000_000, dtype=np.int64)
    in_cat = np.zeros(n_max, dtype=bool)
    in_cat[pk] = True
    w_ref = ray.put(W)

    for _ in range(iters):
        r_ref = ray.put(ranks)

        def contrib(t: pa.Table, _r=r_ref, _w=w_ref) -> pa.Table:
            r = ray.get(_r)
            w_tot = ray.get(_w)
            src = t.column("src").to_numpy().astype(np.int64)
            dst = t.column("dst").to_numpy().astype(np.int64)
            w = t.column("w").to_numpy().astype(np.int64)
            c = (r[src] * damp_pct // 100) * w // w_tot[src]
            u, inv = np.unique(dst, return_inverse=True)
            return pa.table({"dst": pa.array(u),
                             "c": pa.array(np.bincount(inv, weights=c)
                                           .astype(np.int64))})

        p = (edges.map_batches(contrib, batch_format="pyarrow")
             .to_pandas().groupby("dst", as_index=False)["c"].sum())
        ranks = np.full(n_max, teleport, dtype=np.int64)
        ranks[p["dst"].to_numpy(np.int64)] += p["c"].to_numpy(np.int64)
        ranks[~in_cat] = 0

    return pd.DataFrame({"p_partkey": pk, "rank_ppm": ranks[pk]})
