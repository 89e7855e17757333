"""Fact-to-fact joins (SURVEY.md §2.4 extension beyond the broadcast
dimension join in analytics.region_revenue).

When BOTH sides are large, broadcasting is off the table; the Ray-Data
shape is a bucketed co-partition join: tag each side, bucket rows by
``hash(key) % B``, ``groupby(bucket)`` so matching keys co-locate, and
run one vectorized pandas merge per bucket. One all-to-all exchange
total (the groupby); B bounds per-task memory to ~|data|/B. At 100 TB
you pick B so a bucket pair fits a worker's heap, and skewed keys can be
salted on top (the politeness scheduler shows the same pattern on
host_hash).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

_JOIN_BUCKETS = 64


def _read(sf_dir: str, table: str, columns=None):
    return ray.data.read_parquet(f"{sf_dir}/{table}.parquet", columns=columns)


def order_priority_revenue(sf_dir: str) -> pd.DataFrame:
    """TPC-H-Q12-ish: orders ⨝ lineitem on orderkey (both fact-sized),
    revenue cents + line count per order priority. Value-exact vs SQL:
    money quantized to integer cents with FLOOR on both sides."""
    orders = _read(sf_dir, "orders", columns=["o_orderkey", "o_orderpriority"])
    items = _read(sf_dir, "lineitem",
                  columns=["l_orderkey", "l_extendedprice", "l_discount"])

    def tag_orders(t: pa.Table) -> pa.Table:
        key = t.column("o_orderkey").to_numpy()
        return pa.table({
            "key": pa.array(key.astype(np.int64)),
            "o_orderpriority": t.column("o_orderpriority"),
            "disc_cents": pa.array(np.full(len(t), -1, dtype=np.int64)),
            "side": pa.array(np.zeros(len(t), dtype=np.int8)),
            "bucket": pa.array((key % _JOIN_BUCKETS).astype(np.int32)),
        })

    def tag_items(t: pa.Table) -> pa.Table:
        key = t.column("l_orderkey").to_numpy()
        price = t.column("l_extendedprice").to_numpy()
        disc = t.column("l_discount").to_numpy()
        cents = np.floor(price * (1 - disc) * 100).astype(np.int64)
        return pa.table({
            "key": pa.array(key.astype(np.int64)),
            "o_orderpriority": pa.array([""] * len(t), type=pa.string()),
            "disc_cents": pa.array(cents),
            "side": pa.array(np.ones(len(t), dtype=np.int8)),
            "bucket": pa.array((key % _JOIN_BUCKETS).astype(np.int32)),
        })

    def bucket_join(g: pd.DataFrame) -> pd.DataFrame:
        left = g[g["side"] == 0][["key", "o_orderpriority"]]
        right = g[g["side"] == 1][["key", "disc_cents"]]
        m = right.merge(left, on="key")
        # partial aggregate inside the bucket: the second (tiny) exchange
        # moves one row per (priority, bucket)
        out = m.groupby("o_orderpriority", as_index=False).agg(
            revenue_cents=("disc_cents", "sum"),
            n_lines=("disc_cents", "size"))
        return out

    tagged = orders.map_batches(tag_orders, batch_format="pyarrow").union(
        items.map_batches(tag_items, batch_format="pyarrow"))
    partial = tagged.groupby("bucket").map_groups(bucket_join,
                                                  batch_format="pandas")
    out = partial.to_pandas()
    out = out.groupby("o_orderpriority", as_index=False).agg(
        revenue_cents=("revenue_cents", "sum"),
        n_lines=("n_lines", "sum"))
    return out.astype({"revenue_cents": "int64", "n_lines": "int64"})
