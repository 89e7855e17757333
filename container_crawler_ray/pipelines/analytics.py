"""SQL-checkable Ray Data operators over the driver testdata tables
(documents/events/lineitem/orders/customer/nation/region).

These are the operator-inventory entries (SURVEY.md §2.5/§2.6/§2.4 —
aggregations, sorts/top-k, joins, watermark scans) exercised on the
standard tables so the driver's DuckDB oracle can verify them value-exact.

Float discipline for oracle parity: money/metric sums are computed as
integer cents via FLOOR(x*100) on BOTH sides (identical float64 input →
identical floor), and SQL aggregates are CAST(... AS BIGINT) so Arrow
types line up (DuckDB SUM would otherwise widen to HUGEINT/decimal).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data
from ray.data.aggregate import Count, Max, Min, Sum

from ..functions.text import text_stats_batch


def _read(sf_dir: str, table: str, columns=None,
          rows_per_block: int = 65536):
    """Size-aware read: block count scales with the table's row count
    (parquet metadata only), not with the CPU count. These queries are
    exchange-dominated (derive → groupby/sort), and Ray's sort shuffle
    pays per input block — letting a small table split into 64
    CPU-count-sized slivers made the shuffle dominate wall time.
    CPU-heavy per-row stages (regex/md5 over text) pass a SMALL
    ``rows_per_block`` instead, because block count is also the map
    stage's parallelism."""
    import pyarrow.parquet as pq

    path = f"{sf_dir}/{table}.parquet"
    n = pq.ParquetFile(path).metadata.num_rows
    nb = max(2, n // rows_per_block)
    return ray.data.read_parquet(path, columns=columns,
                                 override_num_blocks=nb)


# Map-side combine note: Ray Data's sort-based ``groupby().aggregate()``
# already pre-aggregates within each block before the exchange (its
# AggregateFn accumulate/merge protocol), so the all-to-all moves
# ~|groups| × |blocks| partial rows, not the input table. A hand-rolled
# pandas partial-aggregate stage in front of it was MEASURED 4-8× slower
# at sf0.1 (it multiplies block count and pays a second per-block
# aggregation in Python) — keep these as single direct aggregates.

# ----------------------------------------------------------- aggregations
def docs_per_lang(sf_dir: str) -> pd.DataFrame:
    """A2-style grouped rollup (count/sum/max per language)."""
    ds = _read(sf_dir, "documents", columns=["lang", "n_chars"])
    out = ds.groupby("lang").aggregate(
        Count(alias_name="n_docs"),
        Sum("n_chars", alias_name="sum_chars"),
        Max("n_chars", alias_name="max_chars"),
    )
    return out.to_pandas()


def events_rollup(sf_dir: str) -> pd.DataFrame:
    """Metrics rollup with integer-cents sums (floor parity with SQL)."""
    ds = _read(sf_dir, "events", columns=["event_type", "event_id", "value"])

    def cents(t: pa.Table) -> pa.Table:
        v = np.floor(t.column("value").to_numpy() * 100).astype(np.int64)
        return t.append_column("value_cents", pa.array(v))

    out = ds.map_batches(cents, batch_format="pyarrow").groupby(
        "event_type"
    ).aggregate(
        Count(alias_name="n"),
        Sum("value_cents", alias_name="sum_value_cents"),
        Min("event_id", alias_name="min_event_id"),
        Max("event_id", alias_name="max_event_id"),
    )
    return out.to_pandas()


def q1_pricing(sf_dir: str) -> pd.DataFrame:
    """TPC-H-Q1-shaped pricing summary (partial vectorized derivation →
    grouped aggregate; the groupby is the only shuffle)."""
    ds = _read(sf_dir, "lineitem",
               columns=["l_returnflag", "l_linestatus", "l_quantity",
                        "l_extendedprice", "l_discount"])

    def derive(t: pa.Table) -> pa.Table:
        price = t.column("l_extendedprice").to_numpy()
        disc = t.column("l_discount").to_numpy()
        qty = t.column("l_quantity").to_numpy().astype(np.int64)
        return pa.table(
            {
                "l_returnflag": t.column("l_returnflag"),
                "l_linestatus": t.column("l_linestatus"),
                "qty": pa.array(qty),
                "price_cents": pa.array(
                    np.floor(price * 100).astype(np.int64)),
                "disc_price_cents": pa.array(
                    np.floor(price * (1 - disc) * 100).astype(np.int64)),
            }
        )

    def partial(t: pa.Table) -> pa.Table:
        # the group key has ≤6 distinct values, so each block combines
        # to ≤6 partial rows — the driver folds blocks×6 rows and the
        # pipeline needs NO shuffle (a Ray groupby here sort-exchanges
        # all 600k derived rows to produce 6 groups: 2.3s vs 0.3s)
        df = derive(t).to_pandas()
        g = df.groupby(["l_returnflag", "l_linestatus"], as_index=False)
        out = g.agg(sum_qty=("qty", "sum"),
                    sum_price_cents=("price_cents", "sum"),
                    sum_disc_price_cents=("disc_price_cents", "sum"),
                    n_rows=("qty", "size"))
        return pa.Table.from_pandas(out, preserve_index=False)

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    return (parts.groupby(["l_returnflag", "l_linestatus"],
                          as_index=False)
            .agg(sum_qty=("sum_qty", "sum"),
                 sum_price_cents=("sum_price_cents", "sum"),
                 sum_disc_price_cents=("sum_disc_price_cents", "sum"),
                 n_rows=("n_rows", "sum")))


def user_activity(sf_dir: str) -> pd.DataFrame:
    ds = _read(sf_dir, "events", columns=["user_id", "value", "ts"])

    def derive(t: pa.Table) -> pa.Table:
        v = np.floor(t.column("value").to_numpy() * 100).astype(np.int64)
        ts_us = t.column("ts").cast(pa.int64())
        t = t.append_column("value_cents", pa.array(v))
        return t.append_column("ts_us", ts_us)

    def partial(t: pa.Table) -> pa.Table:
        # per-block pre-aggregation + hash-bucket routing: the final
        # reduce runs as 64 vectorized pandas groupbys instead of one
        # Ray aggregate paying ~60µs × 15k user groups (1.7s → 0.5s)
        df = derive(t).to_pandas()
        g = df.groupby("user_id", as_index=False)
        out = g.agg(n_events=("value_cents", "size"),
                    sum_value_cents=("value_cents", "sum"),
                    first_ts_us=("ts_us", "min"),
                    last_ts_us=("ts_us", "max"))
        out["bk"] = (out["user_id"] % 64).astype("int32")
        return pa.Table.from_pandas(out, preserve_index=False)

    def reduce(g: pd.DataFrame) -> pa.Table:
        out = (g.groupby("user_id", as_index=False)
               .agg(n_events=("n_events", "sum"),
                    sum_value_cents=("sum_value_cents", "sum"),
                    first_ts_us=("first_ts_us", "min"),
                    last_ts_us=("last_ts_us", "max")))
        return pa.Table.from_pandas(out, preserve_index=False)

    return (ds.map_batches(partial, batch_format="pyarrow")
            .groupby("bk").map_groups(reduce, batch_format="pandas")
            .to_pandas())


# ------------------------------------------------- watermark scan / top-k
def events_since_watermark(sf_dir: str, last_row: int = 5000,
                           chunk: int = 2000) -> pd.DataFrame:
    """S1/O3 on the events log: rows with event_id > watermark, in id
    order, chunk-limited — filter pushed into the parquet read."""
    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "user_id", "event_type", "value"],
        filter=pc.field("event_id") > pa.scalar(last_row),
    )
    return ds.sort("event_id").limit(chunk).to_pandas()


def docs_top_nchars(sf_dir: str, k: int = 20) -> pd.DataFrame:
    """O2 global top-k with deterministic tie-break."""
    ds = _read(sf_dir, "documents", columns=["doc_id", "lang", "n_chars"])
    return ds.sort(["n_chars", "doc_id"],
                   descending=[True, False]).limit(k).to_pandas()


def events_topk_per_user(sf_dir: str, k: int = 3) -> pd.DataFrame:
    """O1 per-group priority top-k (the politeness-scheduler shape).
    Users are BUCKETED (``user_id % 64``) so the exchange makes ~64
    group tasks instead of one per user, and the per-bucket kernel is
    one C-level ``sort_values + groupby.head`` over all of the bucket's
    users — per-user Python dispatch was the dominant cost at 10^3
    users and would be fatal at 10^8."""
    ds = _read(sf_dir, "events", columns=["user_id", "event_id", "value"])

    def tag(t: pa.Table) -> pa.Table:
        b = (t.column("user_id").to_numpy() % 64).astype(np.int32)
        return t.append_column("bucket", pa.array(b))

    def topk(g: pd.DataFrame) -> pd.DataFrame:
        out = (g.sort_values(["value", "event_id"],
                             ascending=[False, True], kind="mergesort")
               .groupby("user_id", sort=False).head(k))
        return out[["user_id", "event_id", "value"]]

    return (ds.map_batches(tag, batch_format="pyarrow")
            .groupby("bucket").map_groups(topk, batch_format="pandas")
            .to_pandas())


# ------------------------------------------------------------------ joins
def region_revenue(sf_dir: str) -> pd.DataFrame:
    """J2 broadcast-small-side join chain: orders ⨝ customer ⨝ nation ⨝
    region. The dim chain collapses on the driver into one int8 numpy
    index array (custkey → region index) broadcast once via ray.put; the
    probe is a single vectorized numpy take per batch — no shuffle join,
    no per-row dict lookups."""
    import pyarrow.parquet as pq
    import ray

    cust = pq.read_table(f"{sf_dir}/customer.parquet",
                         columns=["c_custkey", "c_nationkey"])
    nat = pq.read_table(f"{sf_dir}/nation.parquet",
                        columns=["n_nationkey", "n_regionkey"])
    reg = pq.read_table(f"{sf_dir}/region.parquet")
    reg_keys = reg.column("r_regionkey").to_numpy()
    reg_names = reg.column("r_name").to_pylist()
    # nationkey → region index (dense int keys in the TPC-H dims)
    nat_keys = nat.column("n_nationkey").to_numpy()
    nat_reg = nat.column("n_regionkey").to_numpy()
    reg_pos = np.full(int(reg_keys.max()) + 1, -1, dtype=np.int8)
    reg_pos[reg_keys] = np.arange(len(reg_keys), dtype=np.int8)
    nat_to_ri = np.full(int(nat_keys.max()) + 1, -1, dtype=np.int8)
    nat_to_ri[nat_keys] = reg_pos[nat_reg]
    cust_keys = cust.column("c_custkey").to_numpy()
    cust_nat = cust.column("c_nationkey").to_numpy()
    cust_to_ri = np.full(int(cust_keys.max()) + 1, -1, dtype=np.int8)
    cust_to_ri[cust_keys] = nat_to_ri[cust_nat]
    lookup_ref = ray.put((cust_to_ri, reg_names))

    def join_fn(t: pa.Table) -> pa.Table:
        lut, names = ray.get(lookup_ref)    # zero-copy plasma lookup
        keys = t.column("o_custkey").to_numpy()
        ri = lut[keys]
        name_col = pc.take(pa.array(names, type=pa.string()),
                           pa.array(ri.astype(np.int64)))
        cents = np.floor(
            t.column("o_totalprice").to_numpy() * 100).astype(np.int64)
        return pa.table({"r_name": name_col,
                         "price_cents": pa.array(cents)})

    ds = _read(sf_dir, "orders", columns=["o_custkey", "o_totalprice"])
    out = ds.map_batches(join_fn, batch_format="pyarrow").groupby(
        "r_name"
    ).aggregate(
        Count(alias_name="n_orders"),
        Sum("price_cents", alias_name="revenue_cents"),
    )
    return out.to_pandas()


def events_windowed(sf_dir: str) -> pd.DataFrame:
    """Streaming-shaped workload (SURVEY.md §2.9): tumbling 1-hour windows
    per event_type over the ordered events log. Ray Data has no event-time
    windows; the mapping is a derived window-start key + grouped aggregate
    (ordering assumption: none needed — tumbling windows are
    order-insensitive)."""
    ds = _read(sf_dir, "events", columns=["event_type", "ts", "value"])

    def derive(t: pa.Table) -> pa.Table:
        ts_us = t.column("ts").cast(pa.int64()).to_numpy()
        hour_us = 3_600_000_000
        win = (ts_us // hour_us) * hour_us
        v = np.floor(t.column("value").to_numpy() * 100).astype(np.int64)
        return pa.table(
            {
                "event_type": t.column("event_type"),
                "window_start_us": pa.array(win),
                "value_cents": pa.array(v),
            }
        )

    out = ds.map_batches(derive, batch_format="pyarrow").groupby(
        ["event_type", "window_start_us"]
    ).aggregate(
        Count(alias_name="n"),
        Sum("value_cents", alias_name="sum_value_cents"),
    )
    return out.to_pandas()


def events_hopping(sf_dir: str) -> pd.DataFrame:
    """Hopping (sliding) event-time windows: 1-hour windows advancing
    every 15 minutes, so each event lands in exactly 4 overlapping
    windows. The Ray mapping is a map-side EXPLODE (each row emits its
    4 window-start keys — ``np.repeat`` + offset ravel, no Python
    loop) followed by the same grouped aggregate as the tumbling case;
    the exchange grows by the overlap factor, which is the inherent
    cost of hopping windows in any engine (Flink/Beam do the same
    per-pane replication)."""
    hop_us = 900_000_000          # 15 min
    n_panes = 4                   # 1 h window / 15 min hop
    ds = _read(sf_dir, "events", columns=["event_type", "ts", "value"])

    def derive(t: pa.Table) -> pa.Table:
        ts_us = t.column("ts").cast(pa.int64()).to_numpy()
        pane = (ts_us // hop_us) * hop_us
        v = np.floor(t.column("value").to_numpy() * 100).astype(np.int64)
        return pa.table({"event_type": t.column("event_type"),
                         "pane_us": pa.array(pane),
                         "value_cents": pa.array(v)})

    # Pane optimization (Li et al., "No Pane, No Gain"): aggregate once at
    # HOP granularity — the exchange moves one row per (type, 15-min pane)
    # per block with NO overlap-factor replication — then assemble each
    # 4-pane window from the output-sized pane table (a window appears iff
    # one of its panes has data, exactly matching the per-event explode).
    panes = (ds.map_batches(derive, batch_format="pyarrow")
             .groupby(["event_type", "pane_us"])
             .aggregate(Count(alias_name="n"),
                        Sum("value_cents", alias_name="sum_value_cents"))
             .to_pandas())
    win = (panes["pane_us"].to_numpy()[:, None]
           - hop_us * np.arange(n_panes, dtype=np.int64)[None, :]).ravel()
    out = pd.DataFrame({
        "event_type": np.repeat(panes["event_type"].to_numpy(), n_panes),
        "window_start_us": win,
        "n": np.repeat(panes["n"].to_numpy(), n_panes),
        "sum_value_cents": np.repeat(panes["sum_value_cents"].to_numpy(),
                                     n_panes)})
    return (out.groupby(["event_type", "window_start_us"], as_index=False)
            .agg(n=("n", "sum"), sum_value_cents=("sum_value_cents", "sum")))


# ------------------------------------------------------------- text stats
def text_stats(sf_dir: str) -> pd.DataFrame:
    """Integer token/punct counts (RE2 parity with the DuckDB oracle)."""
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"],
               rows_per_block=2048)
    return ds.map_batches(text_stats_batch,
                          batch_format="pyarrow").to_pandas()


def user_sessions(sf_dir: str, gap_us: int = 1_800_000_000) -> pd.DataFrame:
    """Sessionization (streaming-adjacent operator): per-user event
    sessions split at >30-min gaps → session count + largest session.
    Ray shape: one ``groupby(user_id)`` shuffle, vectorized numpy
    (sort/diff/cumsum) per group — the classic order-dependent operator
    SQL needs window functions for. Duplicate timestamps are gap-0 so
    tie order can't change the result."""
    ds = _read(sf_dir, "events", columns=["user_id", "ts"])

    def derive(t: pa.Table) -> pa.Table:
        b = (t.column("user_id").to_numpy() % 64).astype(np.int32)
        return pa.table({"user_id": t.column("user_id"),
                         "ts_us": t.column("ts").cast(pa.int64()),
                         "bucket": pa.array(b)})

    def sessions(g: pd.DataFrame) -> pd.DataFrame:
        # one vectorized pass over ALL of the bucket's users: session
        # breaks at user change or >gap, then two C-level groupbys
        g = g.sort_values(["user_id", "ts_us"], kind="mergesort")
        uid = g["user_id"].to_numpy()
        ts = g["ts_us"].to_numpy()
        news = np.ones(len(g), dtype=bool)
        news[1:] = (uid[1:] != uid[:-1]) | ((ts[1:] - ts[:-1]) > gap_us)
        sid = np.cumsum(news)
        per = (pd.DataFrame({"user_id": uid, "sid": sid})
               .groupby(["user_id", "sid"], sort=False).size()
               .rename("n").reset_index())
        out = per.groupby("user_id", sort=False, as_index=False).agg(
            n_sessions=("sid", "size"), max_session_events=("n", "max"))
        return out

    out = (ds.map_batches(derive, batch_format="pyarrow")
           .groupby("bucket").map_groups(sessions, batch_format="pandas")
           .to_pandas())
    return out.astype({"n_sessions": "int64", "max_session_events": "int64"})


def events_percentiles(sf_dir: str) -> pd.DataFrame:
    """Exact p50/p95 of value-cents per event_type (quantile_disc
    semantics: sorted[ceil(q*n)-1], computed in integer arithmetic so
    the SQL twin matches bit-exactly). Per-group exact quantiles need
    the group's values together — fine for low-cardinality groups; a
    high-cardinality/streaming variant would switch to a mergeable
    sketch (t-digest/KLL) with an approximate oracle."""
    ds = _read(sf_dir, "events", columns=["event_type", "value"])

    def derive(t: pa.Table) -> pa.Table:
        v = np.floor(t.column("value").to_numpy() * 100).astype(np.int64)
        return pa.table({"event_type": t.column("event_type"),
                         "cents": pa.array(v)})

    def quant(g: pd.DataFrame) -> pd.DataFrame:
        v = np.sort(g["cents"].to_numpy())
        n = len(v)
        p50 = v[-(-n // 2) - 1]            # ceil(n/2)-1, integer math
        p95 = v[-(-19 * n // 20) - 1]      # ceil(19n/20)-1
        return pd.DataFrame({"event_type": g["event_type"].iloc[:1],
                             "p50_cents": [int(p50)],
                             "p95_cents": [int(p95)]})

    out = (ds.map_batches(derive, batch_format="pyarrow")
           .groupby("event_type").map_groups(quant, batch_format="pandas")
           .to_pandas())
    return out.astype({"p50_cents": "int64", "p95_cents": "int64"})


def dedup_exact(sf_dir: str) -> pd.DataFrame:
    """A4 exact dedup: hash-partition by content, keep first (min doc_id).
    At 100 TB this groups by a content hash computed in map_batches; at
    testdata scale we group the raw text so the SQL oracle is trivial."""
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    out = ds.groupby("text").aggregate(
        Min("doc_id", alias_name="keep_id"),
        Count(alias_name="n_copies"),
    )
    return out.to_pandas()


def events_value_bands(sf_dir: str) -> pd.DataFrame:
    """Range join of events against a small band/interval table —
    broadcast the band edges and resolve each row's interval with one
    vectorized binary search (``np.searchsorted``) per batch instead of
    shuffling either side. The grouped rollup after the in-map band
    assignment is the only exchange. At 100 TB the band table stays a
    broadcast (it is dimension-sized by construction); a fact×fact
    interval join would switch to the bucketed pattern in ``joins.py``."""
    edges = np.array([0.0, 5.0, 25.0, 75.0, 150.0, 1e6])
    tiers = np.array(["t0", "t1", "t2", "t3", "t4"])
    ds = _read(sf_dir, "events", columns=["value"])

    def band(t: pa.Table) -> pa.Table:
        v = t.column("value").to_numpy()
        idx = np.searchsorted(edges, v, side="right") - 1
        cents = np.floor(v * 100).astype(np.int64)
        return pa.table({"tier": pa.array(tiers[idx]),
                         "value_cents": pa.array(cents)})

    out = ds.map_batches(band, batch_format="pyarrow").groupby(
        "tier"
    ).aggregate(
        Count(alias_name="n"),
        Sum("value_cents", alias_name="sum_value_cents"),
    )
    return out.to_pandas()


def top_tokens(sf_dir: str, topn: int = 50) -> pd.DataFrame:
    """Global token frequency top-N (wordcount at corpus scale). The
    map side emits PRE-AGGREGATED (token, partial-count) rows via one
    ``np.unique`` per batch, so the exchange moves |vocab ∩ batch| rows
    per block — not one row per token occurrence; the groupby-sum then
    reduces partials and only the final top-N is collected. Ties at the
    cut line break on token text, matching the SQL twin exactly."""
    ds = _read(sf_dir, "documents", columns=["text"],
               rows_per_block=2048)

    def partial(t: pa.Table) -> pa.Table:
        texts = t.column("text").to_pylist()
        all_toks = np.array([w for s in texts for w in s.split()],
                            dtype=object)
        if len(all_toks) == 0:
            return pa.table({"tok": pa.array([], type=pa.string()),
                             "n": pa.array([], type=pa.int64())})
        toks, counts = np.unique(all_toks, return_counts=True)
        return pa.table({"tok": pa.array(list(toks), type=pa.string()),
                         "n": pa.array(counts.astype(np.int64))})

    agg = (ds.map_batches(partial, batch_format="pyarrow")
           .groupby("tok").aggregate(Sum("n", alias_name="n")))
    out = (agg.sort(["n", "tok"], descending=[True, False])
           .limit(topn).to_pandas())
    return out.astype({"n": "int64"})


def users_per_event_type(sf_dir: str) -> pd.DataFrame:
    """Exact distinct count (COUNT DISTINCT user_id per event_type) as a
    two-stage shuffle: map-side dedup of (event_type, user_id) pairs per
    batch (np.unique), a groupby on the PAIR to finish the dedup, then a
    tiny per-type count. The first exchange moves at most
    |distinct pairs per block| rows; the second moves one row per pair —
    this is the pattern that survives 10^9 users where a per-group
    nunique() (all of a group's raw rows in one task) would not. An
    approximate variant would swap stage two for a mergeable HLL sketch."""
    ds = _read(sf_dir, "events", columns=["event_type", "user_id"])

    def pairs(t: pa.Table) -> pa.Table:
        et = np.asarray(t.column("event_type"))
        uid = t.column("user_id").to_numpy()
        key = pd.MultiIndex.from_arrays([et, uid])
        uniq = ~key.duplicated()
        return pa.table({"event_type": pa.array(et[uniq]),
                         "user_id": pa.array(uid[uniq])})

    dedup = (ds.map_batches(pairs, batch_format="pyarrow")
             .groupby(["event_type", "user_id"])
             .aggregate(Count(alias_name="_c")))
    out = (dedup.map_batches(
        lambda t: t.select(["event_type"]), batch_format="pyarrow")
        .groupby("event_type").aggregate(Count(alias_name="n_users")))
    return out.to_pandas()


def user_value_rolling(sf_dir: str, window: int = 3) -> pd.DataFrame:
    """Per-user rolling 3-event sum of value-cents in (ts, event_id)
    order — the order-dependent window aggregate SQL expresses as
    ``SUM() OVER (PARTITION BY ... ORDER BY ... ROWS 2 PRECEDING)``.
    One bucketed ``groupby(user_id % 64)`` exchange; the window for ALL
    of a bucket's users is one shifted-cumsum over the
    (user, ts, event_id)-sorted frame — the per-user window lower bound
    is clamped by the row's rank within its user (``cumcount``), so user
    boundaries reset the window without any per-user Python dispatch.
    Event_id joins the sort key so duplicate timestamps cannot make the
    result order-ambiguous."""
    ds = _read(sf_dir, "events", columns=["event_id", "user_id", "ts",
                                          "value"])

    def derive(t: pa.Table) -> pa.Table:
        cents = np.floor(t.column("value").to_numpy() * 100).astype(np.int64)
        b = (t.column("user_id").to_numpy() % 64).astype(np.int32)
        return pa.table({"event_id": t.column("event_id"),
                         "user_id": t.column("user_id"),
                         "ts_us": t.column("ts").cast(pa.int64()),
                         "cents": pa.array(cents),
                         "bucket": pa.array(b)})

    def roll(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts_us", "event_id"],
                          kind="mergesort")
        c = g["cents"].to_numpy()
        rank = g.groupby("user_id", sort=False).cumcount().to_numpy()
        cs = np.concatenate(([0], np.cumsum(c)))
        i = np.arange(len(c))
        lo = i - np.minimum(rank, window - 1)
        out = cs[i + 1] - cs[lo]
        return pd.DataFrame({"user_id": g["user_id"].to_numpy(),
                             "event_id": g["event_id"].to_numpy(),
                             "roll_cents": out})

    out = (ds.map_batches(derive, batch_format="pyarrow")
           .groupby("bucket").map_groups(roll, batch_format="pandas")
           .to_pandas())
    return out.astype({"roll_cents": "int64"})


def docs_hash_sample(sf_dir: str, mod: int = 16) -> pd.DataFrame:
    """Deterministic hash sampling (the reproducible alternative to
    ``ds.random_sample`` for pipelines that must re-select the SAME
    sample on re-run/resume): keep docs where ``hash64(text) % mod == 0``.
    Pure map-side filter — no exchange, no state; the SQL twin recomputes
    the identical MD5-derived bucket."""
    from ..functions.hashing import hash64_many

    ds = _read(sf_dir, "documents",
               columns=["doc_id", "text", "n_chars"],
               rows_per_block=2048)

    def keep(t: pa.Table) -> pa.Table:
        h = hash64_many(t.column("text").to_pylist())
        m = (h % np.uint64(mod)) == 0
        return t.filter(pa.array(m)).select(["doc_id", "n_chars"])

    return ds.map_batches(keep, batch_format="pyarrow").to_pandas()


def users_per_event_type_hll(sf_dir: str) -> pd.DataFrame:
    """APPROXIMATE distinct count via a mergeable HyperLogLog sketch —
    the form that scales past ``users_per_event_type``'s exact pair
    shuffle: the map side folds each block into 4 KiB of registers per
    group, the exchange moves one register row per (group, block), and
    the reduce is an elementwise max. Deterministic given the engine's
    mix64 hash, so the golden oracle (an independent pure-Python HLL)
    matches the estimate EXACTLY even though the estimate itself is
    approximate (±~2% at 4096 registers)."""
    from ..functions.sketch import hll_add, hll_empty, hll_estimate

    ds = _read(sf_dir, "events", columns=["event_type", "user_id"])

    def partial(t: pa.Table) -> pa.Table:
        et = np.asarray(t.column("event_type")).astype(object)
        uid = t.column("user_id").to_numpy().astype(np.uint64)
        types, regs = [], []
        for ty in np.unique(et):
            reg = hll_empty()
            hll_add(reg, uid[et == ty])
            types.append(str(ty))
            regs.append(reg.tobytes())
        return pa.table({"event_type": pa.array(types, type=pa.string()),
                         "reg": pa.array(regs, type=pa.binary())})

    def reduce_group(g: pd.DataFrame) -> pd.DataFrame:
        regs = np.stack([np.frombuffer(b, dtype=np.uint8)
                         for b in g["reg"]])
        merged = regs.max(axis=0)
        return pd.DataFrame({"event_type": g["event_type"].iloc[:1],
                             "n_users_approx": [hll_estimate(merged)]})

    out = (ds.map_batches(partial, batch_format="pyarrow")
           .groupby("event_type").map_groups(reduce_group,
                                             batch_format="pandas")
           .to_pandas())
    return out.astype({"n_users_approx": "int64"})


def token_freq_cms(sf_dir: str) -> pd.DataFrame:
    """Point-query token frequencies from a merged Count-Min sketch
    (``state/cms.py``) — the fixed-size companion to the HLL distinct
    sketch: HLL answers "how many distinct", CMS answers "how often is
    THIS one", both as mergeable integer summaries.

    Distributed shape: each block folds its tokens into a local
    (depth×width) sketch and emits only its NONZERO cells as
    (flat-cell, count) rows, so the exchange moves ≤ depth·width rows
    per block regardless of block token count; a ``groupby(cell)`` sum
    produces the merged sketch (≤ 8192 rows total — integer adds
    commute, so per-block-then-merge equals one global build
    bit-exactly). The probe set (distinct tokens of every 199th
    document — standing in for an external query list) is deduped
    distributedly and estimated under the broadcast sketch
    (``ray.put`` once, zero-copy ``ray.get`` per batch). Estimates are
    one-sided: ``est ≥ true``, overestimate bounded by e·N/width.
    Deterministic given the engine's md5 hash64 + splitmix64 rounds, so
    the golden oracle (independent pure-Python sketch) matches EXACTLY.
    """
    from ..functions.hashing import hash64_many
    from ..state import cms

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"],
               rows_per_block=2048)

    def cells(t: pa.Table) -> pa.Table:
        texts = t.column("text").to_pylist()
        toks = np.array([w for s in texts for w in s.split()],
                        dtype=object)
        if len(toks) == 0:
            return pa.table({"cell": pa.array([], type=pa.int64()),
                             "n": pa.array([], type=pa.int64())})
        uniq, counts = np.unique(toks, return_counts=True)
        sk = cms.sketch_counts(hash64_many(uniq),
                               counts.astype(np.int64))
        flat = sk.ravel()
        nz = np.flatnonzero(flat)
        return pa.table({"cell": pa.array(nz.astype(np.int64)),
                         "n": pa.array(flat[nz])})

    merged = (ds.map_batches(cells, batch_format="pyarrow")
              .groupby("cell").aggregate(Sum("n", alias_name="n"))
              .to_pandas())
    sk = np.zeros(cms.DEPTH * cms.WIDTH, dtype=np.int64)
    sk[merged["cell"].to_numpy()] = merged["n"].to_numpy()
    sk_ref = ray.put(sk.reshape(cms.DEPTH, cms.WIDTH))

    def probe(t: pa.Table) -> pa.Table:
        keep = (t.column("doc_id").to_numpy() % 199) == 0
        texts = np.asarray(t.column("text"), dtype=object)[keep]
        toks = sorted({w for s in texts for w in s.split()})
        return pa.table({"tok": pa.array(toks, type=pa.string())})

    def est(t: pa.Table) -> pa.Table:
        toks = t.column("tok").to_pylist()
        e = cms.estimate(ray.get(sk_ref), hash64_many(toks))
        return pa.table({"tok": t.column("tok"),
                         "est_n": pa.array(e.astype(np.int64))})

    out = (ds.map_batches(probe, batch_format="pyarrow")
           .groupby("tok").aggregate(Count(alias_name="_c"))
           .map_batches(est, batch_format="pyarrow")
           .select_columns(["tok", "est_n"])
           .sort("tok").to_pandas())
    return out.astype({"est_n": "int64"})


def user_event_pivot(sf_dir: str) -> pd.DataFrame:
    """Pivot (crosstab): one row per user with a count column per event
    type. Map side pre-aggregates the crosstab per batch (one pandas
    ``groupby.size`` + ``unstack``), so the exchange moves one partial
    row per (user, block); the groupby-sum finishes it. Fixed, known
    category set — the columns are part of the schema, as a pivot at
    scale requires."""
    types = ["click", "error", "purchase", "signup", "view"]
    ds = _read(sf_dir, "events", columns=["user_id", "event_type"])

    def partial(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        ct = (df.groupby(["user_id", "event_type"], sort=False).size()
              .unstack(fill_value=0))
        cols = {"user_id": pa.array(ct.index.to_numpy().astype(np.int64))}
        for ty in types:
            v = (ct[ty].to_numpy() if ty in ct.columns
                 else np.zeros(len(ct), dtype=np.int64))
            cols[f"n_{ty}"] = pa.array(v.astype(np.int64))
        return pa.table(cols)

    aggs = [Sum(f"n_{ty}", alias_name=f"n_{ty}") for ty in types]
    out = (ds.map_batches(partial, batch_format="pyarrow")
           .groupby("user_id").aggregate(*aggs))
    return out.to_pandas()


def events_grouping_sets(sf_dir: str) -> pd.DataFrame:
    """Multi-level aggregate (GROUPING SETS): totals by (event_type),
    by (user_id) and the grand total in ONE scan — the map side emits a
    partial row per grouping set per batch (so the exchange moves
    |sets| × |groups ∩ batch| rows, never the input twice), and the
    reduce is a single grouped sum. Set keys are encoded as
    (set_id, key) with -1/'' for the rolled-up dimension, matching the
    SQL twin's COALESCE convention."""
    ds = _read(sf_dir, "events", columns=["event_type", "user_id", "value"])

    def partials(t: pa.Table) -> pa.Table:
        et = np.asarray(t.column("event_type")).astype(object)
        uid = t.column("user_id").to_numpy().astype(np.int64)
        cents = np.floor(t.column("value").to_numpy() * 100).astype(np.int64)
        frames = []
        df = pd.DataFrame({"event_type": et, "user_id": uid, "c": cents})
        by_t = df.groupby("event_type", sort=False)["c"].agg(["sum", "size"])
        frames.append(pd.DataFrame({
            "set_id": 0, "event_type": by_t.index.to_numpy(),
            "user_id": -1, "sum_cents": by_t["sum"].to_numpy(),
            "n": by_t["size"].to_numpy()}))
        by_u = df.groupby("user_id", sort=False)["c"].agg(["sum", "size"])
        frames.append(pd.DataFrame({
            "set_id": 1, "event_type": "", "user_id": by_u.index.to_numpy(),
            "sum_cents": by_u["sum"].to_numpy(),
            "n": by_u["size"].to_numpy()}))
        frames.append(pd.DataFrame({
            "set_id": [2], "event_type": [""], "user_id": [-1],
            "sum_cents": [int(cents.sum())], "n": [len(cents)]}))
        out = pd.concat(frames, ignore_index=True)
        return pa.table({
            "set_id": pa.array(out["set_id"].to_numpy().astype(np.int32)),
            "event_type": pa.array(out["event_type"].astype(str).tolist(),
                                   type=pa.string()),
            "user_id": pa.array(out["user_id"].to_numpy().astype(np.int64)),
            "sum_cents": pa.array(out["sum_cents"].to_numpy()
                                  .astype(np.int64)),
            "n": pa.array(out["n"].to_numpy().astype(np.int64)),
        })

    out = (ds.map_batches(partials, batch_format="pyarrow")
           .groupby(["set_id", "event_type", "user_id"])
           .aggregate(Sum("sum_cents", alias_name="sum_cents"),
                      Sum("n", alias_name="n"))
           .to_pandas())
    return out.astype({"sum_cents": "int64", "n": "int64"})


def events_latest_per_key(sf_dir: str) -> pd.DataFrame:
    """Changelog compaction (CDC keep-latest): one surviving row per
    (user_id, event_type) — the newest by (ts, event_id). This is the
    upsert-materialization the reference's container change-scan feeds
    downstream. Bucketed by ``user_id % 64`` so the per-bucket kernel is
    one C-level sort + drop_duplicates over all of the bucket's keys;
    (ts, event_id) in the sort makes duplicate timestamps
    deterministic."""
    ds = _read(sf_dir, "events", columns=["event_id", "user_id",
                                          "event_type", "ts", "value"])

    def derive(t: pa.Table) -> pa.Table:
        b = (t.column("user_id").to_numpy() % 64).astype(np.int32)
        cents = np.floor(t.column("value").to_numpy() * 100).astype(np.int64)
        return pa.table({"event_id": t.column("event_id"),
                         "user_id": t.column("user_id"),
                         "event_type": t.column("event_type"),
                         "ts_us": t.column("ts").cast(pa.int64()),
                         "value_cents": pa.array(cents),
                         "bucket": pa.array(b)})

    def latest(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["ts_us", "event_id"], kind="mergesort")
        out = g.drop_duplicates(["user_id", "event_type"], keep="last")
        return out[["user_id", "event_type", "event_id", "ts_us",
                    "value_cents"]]

    return (ds.map_batches(derive, batch_format="pyarrow")
            .groupby("bucket").map_groups(latest, batch_format="pandas")
            .to_pandas())


def users_click_and_purchase(sf_dir: str) -> pd.DataFrame:
    """Set intersection (audience segmentation): users appearing in BOTH
    the click and the purchase streams. Map side emits deduped
    (user_id, side-bit) pairs per batch; one groupby ORs the bits and
    keeps users with both — the exchange moves at most two small rows
    per user per block, never raw events. INTERSECT in the SQL twin."""
    ds = _read(sf_dir, "events", columns=["user_id", "event_type"])

    def sides(t: pa.Table) -> pa.Table:
        et = np.asarray(t.column("event_type")).astype(object)
        uid = t.column("user_id").to_numpy().astype(np.int64)
        out_u, out_b = [], []
        for ty, bit in (("click", 1), ("purchase", 2)):
            u = np.unique(uid[et == ty])
            out_u.append(u)
            out_b.append(np.full(len(u), bit, dtype=np.int64))
        return pa.table({"user_id": pa.array(np.concatenate(out_u)),
                         "bit": pa.array(np.concatenate(out_b))})

    agg = (ds.map_batches(sides, batch_format="pyarrow")
           .groupby("user_id").aggregate(Max("bit", alias_name="mx"),
                                         Min("bit", alias_name="mn")))

    def keep(t: pa.Table) -> pa.Table:
        m = ((t.column("mx").to_numpy() == 2)
             & (t.column("mn").to_numpy() == 1))   # saw both bit values
        return pa.table({"user_id": pa.array(
            t.column("user_id").to_numpy()[m].astype(np.int64))})

    return agg.map_batches(keep, batch_format="pyarrow").to_pandas()


def events_ranked(sf_dir: str, k: int = 2) -> pd.DataFrame:
    """Ranking window function (ROW_NUMBER): each user's k most recent
    events with their rank. Same bucketed-window shape as
    ``user_value_rolling`` — one ``user_id % 64`` exchange, then the rank
    for ALL of a bucket's users is one C-level mergesort +
    ``groupby.cumcount`` over the (user, -ts, -event_id)-sorted frame; no
    per-user Python dispatch. (ts DESC, event_id DESC) is a total order,
    so ranks are deterministic under duplicate timestamps."""
    ds = _read(sf_dir, "events", columns=["event_id", "user_id", "ts"])

    def derive(t: pa.Table) -> pa.Table:
        b = (t.column("user_id").to_numpy() % 64).astype(np.int32)
        return pa.table({"event_id": t.column("event_id"),
                         "user_id": t.column("user_id"),
                         "ts_us": t.column("ts").cast(pa.int64()),
                         "bucket": pa.array(b)})

    def rank(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts_us", "event_id"],
                          ascending=[True, False, False],
                          kind="mergesort")
        rnk = g.groupby("user_id", sort=False).cumcount().to_numpy() + 1
        keep = rnk <= k
        return pd.DataFrame({"user_id": g["user_id"].to_numpy()[keep],
                             "event_id": g["event_id"].to_numpy()[keep],
                             "rnk": rnk[keep].astype(np.int64)})

    return (ds.map_batches(derive, batch_format="pyarrow")
            .groupby("bucket").map_groups(rank, batch_format="pandas")
            .to_pandas())


def events_lag_delta(sf_dir: str) -> pd.DataFrame:
    """LAG window function: per user in (ts, event_id) order, the change
    in value-cents from the user's previous event (first event per user
    has no predecessor and is dropped, = SQL ``WHERE prev IS NOT NULL``).
    One bucketed exchange; the lag for every user in a bucket is a single
    ``shift(1)`` over the sorted frame with a same-user mask — user
    boundaries never leak a predecessor across users."""
    ds = _read(sf_dir, "events", columns=["event_id", "user_id", "ts",
                                          "value"])

    def derive(t: pa.Table) -> pa.Table:
        b = (t.column("user_id").to_numpy() % 64).astype(np.int32)
        cents = np.floor(t.column("value").to_numpy() * 100).astype(np.int64)
        return pa.table({"event_id": t.column("event_id"),
                         "user_id": t.column("user_id"),
                         "ts_us": t.column("ts").cast(pa.int64()),
                         "cents": pa.array(cents),
                         "bucket": pa.array(b)})

    def lag(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts_us", "event_id"],
                          kind="mergesort")
        uid = g["user_id"].to_numpy()
        c = g["cents"].to_numpy()
        same = np.empty(len(g), dtype=bool)
        same[0] = False
        same[1:] = uid[1:] == uid[:-1]
        prev = np.empty_like(c)
        prev[1:] = c[:-1]
        return pd.DataFrame({
            "user_id": uid[same],
            "event_id": g["event_id"].to_numpy()[same],
            "delta_cents": (c - prev)[same].astype(np.int64)})

    return (ds.map_batches(derive, batch_format="pyarrow")
            .groupby("bucket").map_groups(lag, batch_format="pandas")
            .to_pandas())


def events_props_deciles(sf_dir: str) -> pd.DataFrame:
    """Semi-structured extraction (SURVEY §2.8 json fn, exercised as a
    pipeline): pull the integer ``k`` field out of the ``props`` JSON
    string column, then aggregate value-cents per k-decile. The extract
    is one vectorized C-regex pass (``pandas .str.extract``) with a
    ``json.loads`` fallback only for rows the fast path misses — never a
    per-row Python json parse in the hot loop."""
    from ..functions.text import json_int_field

    ds = _read(sf_dir, "events", columns=["props", "value"])

    def extract(t: pa.Table) -> pa.Table:
        kv = json_int_field(t.column("props").to_pylist(), "k")
        cents = np.floor(t.column("value").to_numpy() * 100).astype(np.int64)
        ok = kv != np.iinfo(np.int64).min
        return pa.table({"k_decile": pa.array(kv[ok] // 10),
                         "cents": pa.array(cents[ok])})

    out = (ds.map_batches(extract, batch_format="pyarrow")
           .groupby("k_decile")
           .aggregate(Count(alias_name="n"),
                      Sum("cents", alias_name="sum_cents"))
           .to_pandas())
    return out.astype({"n": "int64", "sum_cents": "int64"})


def events_stratified_sample(sf_dir: str) -> pd.DataFrame:
    """Stratified deterministic sampling: per-event-type keep rates
    (purchase 1/1, signup 1/2, click 1/4, error 1/8, view 1/16) applied
    via the engine's md5-derived hash of the event id — reproducible
    across re-runs/resume (same rows survive every time), map-side only
    (no exchange, no state), and the SQL twin recomputes the identical
    bucket from ``md5(CAST(event_id AS VARCHAR))``. The hash uses the top
    60 bits (15 hex chars) so DuckDB's UBIGINT parse can mirror it."""
    from ..functions.hashing import hash64_many

    rates = {"purchase": 1, "signup": 2, "click": 4, "error": 8,
             "view": 16}
    ds = _read(sf_dir, "events", columns=["event_id", "event_type",
                                          "value"])

    def keep(t: pa.Table) -> pa.Table:
        eid = t.column("event_id").to_numpy()
        et = np.asarray(t.column("event_type")).astype(object)
        h60 = hash64_many([str(e) for e in eid]) >> np.uint64(4)
        rate = np.asarray([rates[x] for x in et], dtype=np.uint64)
        m = (h60 % rate) == 0
        cents = np.floor(t.column("value").to_numpy() * 100).astype(np.int64)
        return pa.table({"event_id": pa.array(eid[m]),
                         "event_type": pa.array(et[m], type=pa.string()),
                         "value_cents": pa.array(cents[m])})

    return ds.map_batches(keep, batch_format="pyarrow").to_pandas()


def events_value_histogram(sf_dir: str) -> pd.DataFrame:
    """Mergeable fixed-width-histogram quantile sketch — the O(bins)
    alternative to ``events_percentiles``'s exact per-group quantile,
    which is what survives 100 TB (the exchange moves one (type, bin,
    count) row per block instead of every value; the sketch state is a
    few KB per group regardless of input size). Estimates are the lower
    edge of the bin holding the quantile rank (bin width 50 cents), so
    they are deterministic and the SQL twin reproduces them exactly from
    the same binning + cumulative-count rule."""
    ds = _read(sf_dir, "events", columns=["event_type", "value"])
    width = 50

    def partial(t: pa.Table) -> pa.Table:
        et = np.asarray(t.column("event_type")).astype(object)
        cents = np.floor(t.column("value").to_numpy() * 100).astype(np.int64)
        bins = np.floor_divide(cents, width)
        types, out_bin, out_n = [], [], []
        for ty in np.unique(et):
            m = et == ty
            u, c = np.unique(bins[m], return_counts=True)
            types.extend([str(ty)] * len(u))
            out_bin.append(u)
            out_n.append(c)
        return pa.table({"event_type": pa.array(types, type=pa.string()),
                         "bin": pa.array(np.concatenate(out_bin)),
                         "n": pa.array(np.concatenate(out_n)
                                       .astype(np.int64))})

    hist = (ds.map_batches(partial, batch_format="pyarrow")
            .groupby(["event_type", "bin"])
            .aggregate(Sum("n", alias_name="n"))
            .to_pandas())
    # the sketch result is O(types × bins) — tiny by construction; the
    # quantile read-off is driver-side arithmetic on the sketch, not on
    # the data.
    rows = []
    for ty, g in hist.groupby("event_type"):
        g = g.sort_values("bin")
        cc = g["n"].cumsum().to_numpy()
        n = int(cc[-1])
        b = g["bin"].to_numpy()
        row = {"event_type": ty, "n": n}
        for q, col in ((0.5, "p50_est_cents"), (0.95, "p95_est_cents")):
            rank = int(np.ceil(q * n))
            row[col] = int(b[np.searchsorted(cc, rank)] * width)
        rows.append(row)
    return pd.DataFrame(rows).astype({"n": "int64",
                                      "p50_est_cents": "int64",
                                      "p95_est_cents": "int64"})


def users_click_no_purchase(sf_dir: str,
                            value_floor: float = 95.0) -> pd.DataFrame:
    """Set difference (EXCEPT): users with a high-value click
    (``value > value_floor``) who never made a high-value purchase.
    Same exchange discipline as ``users_click_and_purchase`` — map side
    emits deduped (user_id, side-bit) pairs, one groupby reduces to
    (min-bit, max-bit), and ``mn == mx == 1`` means the user only ever
    appeared on the click side."""
    ds = _read(sf_dir, "events", columns=["user_id", "event_type",
                                          "value"])

    def sides(t: pa.Table) -> pa.Table:
        et = np.asarray(t.column("event_type")).astype(object)
        uid = t.column("user_id").to_numpy().astype(np.int64)
        hot = t.column("value").to_numpy() > value_floor
        out_u, out_b = [], []
        for ty, bit in (("click", 1), ("purchase", 2)):
            u = np.unique(uid[(et == ty) & hot])
            out_u.append(u)
            out_b.append(np.full(len(u), bit, dtype=np.int64))
        return pa.table({"user_id": pa.array(np.concatenate(out_u)),
                         "bit": pa.array(np.concatenate(out_b))})

    agg = (ds.map_batches(sides, batch_format="pyarrow")
           .groupby("user_id").aggregate(Max("bit", alias_name="mx"),
                                         Min("bit", alias_name="mn")))

    def keep(t: pa.Table) -> pa.Table:
        m = ((t.column("mx").to_numpy() == 1)
             & (t.column("mn").to_numpy() == 1))
        return pa.table({"user_id": pa.array(
            t.column("user_id").to_numpy()[m].astype(np.int64))})

    return agg.map_batches(keep, batch_format="pyarrow").to_pandas()


def docs_per_source_cap(sf_dir: str, cap: int = 5) -> pd.DataFrame:
    """Per-domain cap sampling (corpus balancing): keep at most ``cap``
    documents per source, lowest doc_id first — the per-host document
    quota every crawl corpus applies before training. Same bucketed
    top-k shape as ``events_topk_per_user``: sources are hash-bucketed
    so the exchange makes ~64 group tasks, and each bucket runs one
    C-level sort + ``groupby.head`` across all its sources."""
    from ..functions.hashing import hash64_many

    ds = _read(sf_dir, "documents",
               columns=["doc_id", "source", "n_chars"])

    def tag(t: pa.Table) -> pa.Table:
        src = np.asarray(t.column("source")).astype(object)
        b = (hash64_many(src) % np.uint64(64)).astype(np.int32)
        return t.append_column("bucket", pa.array(b))

    def head(g: pd.DataFrame) -> pd.DataFrame:
        out = (g.sort_values("doc_id", kind="mergesort")
               .groupby("source", sort=False).head(cap))
        return out[["doc_id", "source", "n_chars"]]

    return (ds.map_batches(tag, batch_format="pyarrow")
            .groupby("bucket").map_groups(head, batch_format="pandas")
            .to_pandas())


def doc_repetition(sf_dir: str) -> pd.DataFrame:
    """Within-document repetition signal (Gopher-style quality filter):
    for each document, the occurrence count of its most frequent word
    bigram and the fraction of tokens that bigram covers (basis points).
    Entirely map-side — a document never spans blocks, so there is NO
    exchange at all; each batch tokenizes into one flat pandas frame and
    reduces with C-level groupby kernels (no per-document Python loop)."""
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"],
               rows_per_block=2048)

    def rep(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy().astype(np.int64)
        texts = t.column("text").to_pylist()
        toks = [s.split() for s in texts]
        n_tok = np.array([len(w) for w in toks], dtype=np.int64)
        df = pd.DataFrame({
            "doc": np.repeat(ids, n_tok),
            "tok": np.concatenate([np.asarray(w, dtype=object)
                                   for w in toks]) if n_tok.sum()
                   else np.array([], dtype=object)})
        df["nxt"] = df["tok"].shift(-1)
        # last token of each doc has no successor within the doc
        df["valid"] = df["doc"] == df["doc"].shift(-1)
        big = df[df["valid"]]
        top = pd.Series(0, index=ids, dtype=np.int64)
        if len(big):
            cnt = (big.groupby(["doc", "tok", "nxt"], sort=False)
                   .size().groupby(level=0).max())
            top.loc[cnt.index] = cnt.to_numpy(np.int64)
        top_n = top.to_numpy(np.int64)
        rep_bp = np.where(n_tok >= 2, top_n * 2 * 10000 // np.maximum(n_tok, 1), 0)
        return pa.table({"doc_id": pa.array(ids),
                         "n_tokens": pa.array(n_tok),
                         "top_bigram_n": pa.array(top_n),
                         "rep_bp": pa.array(rep_bp.astype(np.int64))})

    return ds.map_batches(rep, batch_format="pyarrow").to_pandas()


def tfidf_top_terms(sf_dir: str, k: int = 3) -> pd.DataFrame:
    """Per-document top-k TF-IDF terms, with an integer-exact score
    (``score_ppm = tf * 1_000_000 // df`` — monotone in tf/df, so the
    ranking equals the float tf·idf ranking and is reproducible in SQL).

    Two passes over documents, one vocabulary-sized exchange: pass 1
    emits per-batch (token, df-partial) rows — each (doc, token) pair
    counts once, and docs never span blocks, so summing partials is the
    exact document frequency; the vocabulary (Zipf-small relative to
    the corpus) is broadcast once via ``ray.put``. Pass 2 recomputes tf
    map-side, scores against the broadcast df, and takes per-doc top-k
    INSIDE the batch — the heavy (doc, token) table is never shuffled."""
    import ray

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"],
               rows_per_block=2048)

    def _tf_frame(t: pa.Table) -> pd.DataFrame:
        ids = t.column("doc_id").to_numpy().astype(np.int64)
        toks = [s.split() for s in t.column("text").to_pylist()]
        n_tok = np.array([len(w) for w in toks], dtype=np.int64)
        flat = pd.DataFrame({
            "doc_id": np.repeat(ids, n_tok),
            "tok": np.concatenate([np.asarray(w, dtype=object)
                                   for w in toks]) if n_tok.sum()
                   else np.array([], dtype=object)})
        return (flat.groupby(["doc_id", "tok"], sort=False)
                .size().rename("tf").reset_index())

    def df_partial(t: pa.Table) -> pa.Table:
        tf = _tf_frame(t)
        dfc = tf.groupby("tok", sort=False).size()
        return pa.table({"tok": pa.array(dfc.index.to_numpy(object),
                                         type=pa.string()),
                         "df": pa.array(dfc.to_numpy(np.int64))})

    vocab = (ds.map_batches(df_partial, batch_format="pyarrow")
             .groupby("tok").aggregate(Sum("df", alias_name="df"))
             .to_pandas())
    vref = ray.put(dict(zip(vocab["tok"], vocab["df"].astype(np.int64))))

    def score(t: pa.Table) -> pa.Table:
        df_of = ray.get(vref)
        tf = _tf_frame(t)
        tf["df"] = tf["tok"].map(df_of).astype(np.int64)
        tf["score_ppm"] = tf["tf"].to_numpy(np.int64) * 1_000_000 \
            // tf["df"].to_numpy(np.int64)
        top = (tf.sort_values(["score_ppm", "tok"],
                              ascending=[False, True], kind="mergesort")
               .groupby("doc_id", sort=False).head(k))
        return pa.table({
            "doc_id": pa.array(top["doc_id"].to_numpy(np.int64)),
            "tok": pa.array(top["tok"].to_numpy(object),
                            type=pa.string()),
            "tf": pa.array(top["tf"].to_numpy(np.int64)),
            "df": pa.array(top["df"].to_numpy(np.int64)),
            "score_ppm": pa.array(top["score_ppm"].to_numpy(np.int64))})

    return ds.map_batches(score, batch_format="pyarrow").to_pandas()


def redact_terms(sf_dir: str,
                 pattern: str = r"\b(customer|spark|value)\b",
                 repl: str = "[REDACTED]") -> pd.DataFrame:
    """Dictionary/pattern redaction over documents (the PII-scrub shape:
    a compiled alternation of sensitive patterns, replace + audit
    count). The synthetic corpus has no emails/phones, so the term list
    stands in for PII regexes — the machinery (compiled pattern once
    per actor, vectorized count + sub per batch, audit columns out) is
    exactly what an email/phone/IP scrub plugs into via ``pattern``.
    Entirely map-side: no exchange, output is (doc_id, n_hits,
    n_chars_redacted)."""
    import re

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"],
               rows_per_block=2048)

    class Redactor:
        def __init__(self):
            self.rx = re.compile(pattern)

        def __call__(self, t: pa.Table) -> pa.Table:
            texts = t.column("text").to_pylist()
            rx = self.rx
            hits = np.fromiter((len(rx.findall(s)) for s in texts),
                               dtype=np.int64, count=len(texts))
            red = [rx.sub(repl, s) for s in texts]
            return pa.table({
                "doc_id": t.column("doc_id"),
                "n_hits": pa.array(hits),
                "n_chars_redacted": pa.array(
                    np.fromiter((len(s) for s in red), dtype=np.int64,
                                count=len(red)))})

    return ds.map_batches(Redactor, concurrency=(1, 16),
                          batch_format="pyarrow").to_pandas()


def events_funnel(sf_dir: str) -> pd.DataFrame:
    """Ordered-sequence funnel: users who did view → click → purchase
    in strict timestamp order. Per-user state never crosses the one
    exchange: users are bucketed (``user_id % 64``), and each bucket
    resolves the funnel with three vectorized pandas merges (min view
    ts per user → first click strictly after it → any purchase
    strictly after that); the final reduce sums three counters."""
    ds = _read(sf_dir, "events", columns=["user_id", "event_type", "ts"])

    def tag(t: pa.Table) -> pa.Table:
        uid = t.column("user_id").to_numpy().astype(np.int64)
        return pa.table({
            "user_id": pa.array(uid),
            "event_type": t.column("event_type"),
            "ts": pa.array(t.column("ts").to_numpy()
                           .astype("datetime64[us]").astype(np.int64)),
            "bucket": pa.array((uid % 64).astype(np.int32))})

    def funnel(g: pd.DataFrame) -> pd.DataFrame:
        v = (g[g["event_type"] == "view"].groupby("user_id")["ts"].min()
             .rename("vt").reset_index())
        c = g[g["event_type"] == "click"].merge(v, on="user_id")
        c = (c[c["ts"] > c["vt"]].groupby("user_id")["ts"].min()
             .rename("ct").reset_index())
        p = g[g["event_type"] == "purchase"].merge(c, on="user_id")
        n_funnel = p[p["ts"] > p["ct"]]["user_id"].nunique()
        return pd.DataFrame({"n_users_view": [np.int64(len(v))],
                             "n_users_view_click": [np.int64(len(c))],
                             "n_users_funnel": [np.int64(n_funnel)]})

    part = (ds.map_batches(tag, batch_format="pyarrow")
            .groupby("bucket").map_groups(funnel, batch_format="pandas")
            .to_pandas())
    return pd.DataFrame({
        "n_users_view": [int(part["n_users_view"].sum())],
        "n_users_view_click": [int(part["n_users_view_click"].sum())],
        "n_users_funnel": [int(part["n_users_funnel"].sum())]})


def doc_token_rank(sf_dir: str) -> pd.DataFrame:
    """Per-document mean-frequency-rank quality signal: rank every
    vocabulary token by global count (rank 1 = most frequent,
    deterministic ``(count desc, token)`` order → rank is exactly
    row_number, no ties), then score each document by the SUM of its
    tokens' ranks plus its token count — common-word documents score
    low, rare-word salads score high, and the two integer outputs let
    any consumer form the exact mean.

    Same two-pass broadcast-vocabulary shape as ``tfidf_top_terms``:
    the token-count exchange moves (token, partial-count) rows only;
    the Zipf-small ranked vocabulary is broadcast once via
    ``ray.put``; pass 2 is map-side."""
    import ray

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"],
               rows_per_block=2048)

    def tok_partial(t: pa.Table) -> pa.Table:
        toks = [s.split() for s in t.column("text").to_pylist()]
        flat = pd.Series(np.concatenate(
            [np.asarray(w, dtype=object) for w in toks])
            if sum(len(w) for w in toks) else [], dtype=object)
        c = flat.value_counts()
        return pa.table({"tok": pa.array(c.index.to_numpy(object),
                                         type=pa.string()),
                         "n": pa.array(c.to_numpy(np.int64))})

    vocab = (ds.map_batches(tok_partial, batch_format="pyarrow")
             .groupby("tok").aggregate(Sum("n", alias_name="n"))
             .to_pandas())
    vocab = vocab.sort_values(["n", "tok"], ascending=[False, True],
                              kind="mergesort").reset_index(drop=True)
    rank_of = dict(zip(vocab["tok"], np.arange(1, len(vocab) + 1,
                                               dtype=np.int64)))
    ref = ray.put(rank_of)

    def score(t: pa.Table) -> pa.Table:
        ro = ray.get(ref)
        ids = t.column("doc_id").to_numpy().astype(np.int64)
        toks = [s.split() for s in t.column("text").to_pylist()]
        n_tok = np.fromiter((len(w) for w in toks), dtype=np.int64,
                            count=len(toks))
        rsum = np.fromiter(
            (sum(ro[w] for w in ws) for ws in toks),
            dtype=np.int64, count=len(toks))
        return pa.table({"doc_id": pa.array(ids),
                         "n_tokens": pa.array(n_tok),
                         "rank_sum": pa.array(rsum)})

    return ds.map_batches(score, batch_format="pyarrow").to_pandas()


def events_rollup_incremental(sf_dir: str) -> pd.DataFrame:
    """Incremental materialized aggregate — the analytics twin of the
    crawl's S1 watermark scan (``stages/scan.py``): the rollup is kept
    as a MERGEABLE partial-aggregate state table (count→sum, sum→sum,
    min→min, max→max), and each increment scans only rows past the
    watermark (``event_id`` predicate pushed into the parquet read) and
    merges group-wise. Two increments here (history ≤ wm, delta > wm);
    the oracle is the one-shot SQL aggregate — incremental ≡ full is
    exactly the invariant a 100-TB pipeline needs to re-run cheaply.
    At scale each increment costs O(delta), never O(history)."""
    import pyarrow.parquet as pq_

    path = f"{sf_dir}/events.parquet"
    n = pq_.ParquetFile(path).metadata.num_rows
    wm = n // 2  # watermark after the first increment

    def increment(lo: int, hi: int):
        ds = ray.data.read_parquet(
            path, columns=["event_type", "event_id", "value"],
            filter=(pc.field("event_id") > pa.scalar(lo))
            & (pc.field("event_id") <= pa.scalar(hi)))

        def partial(t: pa.Table) -> pa.Table:
            v = np.floor(t.column("value").to_numpy() * 100) \
                .astype(np.int64)
            df = pd.DataFrame({
                "event_type": t.column("event_type")
                .to_numpy(zero_copy_only=False),
                "value_cents": v,
                "event_id": t.column("event_id").to_numpy()
                .astype(np.int64)})
            g = df.groupby("event_type", as_index=False).agg(
                n=("event_id", "size"),
                sum_value_cents=("value_cents", "sum"),
                min_event_id=("event_id", "min"),
                max_event_id=("event_id", "max"))
            return pa.Table.from_pandas(g, preserve_index=False)

        return (ds.map_batches(partial, batch_format="pyarrow")
                .to_pandas())

    def merge(states: list[pd.DataFrame]) -> pd.DataFrame:
        s = pd.concat(states, ignore_index=True)
        return (s.groupby("event_type", as_index=False).agg(
            n=("n", "sum"),
            sum_value_cents=("sum_value_cents", "sum"),
            min_event_id=("min_event_id", "min"),
            max_event_id=("max_event_id", "max")))

    state = increment(-1, wm)          # increment 1: bootstrap to wm
    delta = increment(wm, 1 << 62)     # increment 2: wm → head
    out = merge([state, delta])
    return out.astype({"n": "int64", "sum_value_cents": "int64",
                       "min_event_id": "int64", "max_event_id": "int64"})


def lineitem_unpivot(sf_dir: str) -> pd.DataFrame:
    """Wide→long melt (UNPIVOT): every lineitem row expands to one row
    per measure column (quantity, extendedprice, discount, tax). The
    expansion is a column-stacked Arrow build inside ``map_batches``
    (np.repeat/np.tile — no per-row Python), pre-aggregated per
    (l_returnflag, measure) in the same kernel so the only exchange is
    the |flags|×4-row groupby."""
    MEASURES = ("discount", "extendedprice", "quantity", "tax")
    ds = _read(sf_dir, "lineitem",
               columns=["l_returnflag", "l_quantity", "l_extendedprice",
                        "l_discount", "l_tax"])

    def melt(t: pa.Table) -> pa.Table:
        flag = t.column("l_returnflag").to_numpy(zero_copy_only=False)
        k = len(t)
        cents = np.concatenate([
            np.floor(t.column(f"l_{m}").to_numpy() * 100).astype(np.int64)
            for m in MEASURES])
        df = pd.DataFrame({
            "l_returnflag": np.tile(flag, len(MEASURES)),
            "measure": np.repeat(np.asarray(MEASURES, dtype=object), k),
            "cents": cents})
        g = (df.groupby(["l_returnflag", "measure"], as_index=False)
             .agg(total_cents=("cents", "sum"),
                  n=("cents", "size")))
        return pa.Table.from_pandas(g, preserve_index=False)

    part = ds.map_batches(melt, batch_format="pyarrow").to_pandas()
    out = (part.groupby(["l_returnflag", "measure"], as_index=False)
           .agg(total_cents=("total_cents", "sum"), n=("n", "sum")))
    return out.astype({"total_cents": "int64", "n": "int64"})


def user_value_time_window(sf_dir: str,
                           window_us: int = 3_600_000_000) -> pd.DataFrame:
    """Time-RANGE windowed aggregate: for every event, the same user's
    value-cents summed over the trailing hour INCLUSIVE of equal-ts
    peers — SQL's ``SUM() OVER (PARTITION BY user ORDER BY ts RANGE
    BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)``, the
    time-based sibling of ``user_value_rolling``'s ROWS window.

    One bucketed ``groupby(user_id % 64)`` exchange; inside a bucket
    every user's window bounds come from TWO ``np.searchsorted`` calls
    total: users are dense-ranked and each user's timestamps are
    offset into a disjoint band (``rank · span``), making the bucket's
    (user, ts) order a single monotonic int64 axis — no per-user
    dispatch. Band arithmetic bounds the bucket at
    ``users_per_bucket · time_span < 2^63`` µs; at larger scale the
    bucket count is the dial (more buckets → fewer users per bucket).
    """
    ds = _read(sf_dir, "events", columns=["event_id", "user_id", "ts",
                                          "value"])

    def derive(t: pa.Table) -> pa.Table:
        cents = np.floor(t.column("value").to_numpy() * 100).astype(np.int64)
        b = (t.column("user_id").to_numpy() % 64).astype(np.int32)
        return pa.table({"event_id": t.column("event_id"),
                         "user_id": t.column("user_id"),
                         "ts_us": t.column("ts").cast(pa.int64()),
                         "cents": pa.array(cents),
                         "bucket": pa.array(b)})

    def win(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts_us", "event_id"],
                          kind="mergesort")
        ts = g["ts_us"].to_numpy(np.int64)
        u_idx = pd.factorize(g["user_id"].to_numpy(), sort=False)[0]
        tmin = ts.min()
        span = np.int64(ts.max() - tmin + window_us + 2)
        adj = u_idx.astype(np.int64) * span + (ts - tmin)
        cs = np.concatenate(([0], np.cumsum(g["cents"].to_numpy())))
        lo = np.searchsorted(adj, adj - np.int64(window_us), side="left")
        hi = np.searchsorted(adj, adj, side="right")
        return pd.DataFrame({"event_id": g["event_id"].to_numpy(),
                             "user_id": g["user_id"].to_numpy(),
                             "win_cents": cs[hi] - cs[lo]})

    out = (ds.map_batches(derive, batch_format="pyarrow")
           .groupby("bucket").map_groups(win, batch_format="pandas")
           .to_pandas())
    return out.astype({"win_cents": "int64"})


def doc_posting_hashes(sf_dir: str) -> pd.DataFrame:
    """Inverted-index build, verified by content: per term, the
    document frequency and an order-canonical digest of the posting
    list (md5 of the comma-joined ascending doc_ids, truncated to the
    engine's 15-hex convention) — so the SQL twin can check the FULL
    index without hauling list columns through the comparator.

    Ray shape: per-doc-distinct (term, doc_id) pairs map-side (the
    exchange moves one row per posting entry, the floor for an exact
    index); terms are co-located by ``hash64(term) % 64`` so each
    bucket finalizes its terms' postings with C-level sort + groupby
    joins. At web scale the stopword head makes single giant postings
    — there you cap or segment postings per (term, doc-range) shard;
    the digest-per-shard check works unchanged."""
    import hashlib

    from ..functions.hashing import hash64_many

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"],
               rows_per_block=2048)

    def pairs(t: pa.Table) -> pa.Table:
        texts = t.column("text").to_pylist()
        ids = t.column("doc_id").to_numpy().astype(np.int64)
        toks, docs = [], []
        for did, s in zip(ids, texts):
            uniq = sorted(set(s.split()))
            toks.extend(uniq)
            docs.extend([did] * len(uniq))
        toks = np.asarray(toks, dtype=object)
        b = (hash64_many(toks) % np.uint64(64)).astype(np.int32) \
            if len(toks) else np.array([], dtype=np.int32)
        return pa.table({"tok": pa.array(list(toks), type=pa.string()),
                         "doc_id": pa.array(np.asarray(docs,
                                                       dtype=np.int64)),
                         "bucket": pa.array(b)})

    def finalize(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["tok", "doc_id"], kind="mergesort")
        ids_str = g["doc_id"].astype(str)
        agg = (pd.DataFrame({"tok": g["tok"], "s": ids_str})
               .groupby("tok", sort=False)["s"]
               .agg([("n_docs", "size"), ("joined", ",".join)])
               .reset_index())
        ph = np.fromiter(
            (int(hashlib.md5(s.encode()).hexdigest()[:15], 16)
             for s in agg["joined"]),
            dtype=np.uint64, count=len(agg))
        return pd.DataFrame({"tok": agg["tok"],
                             "n_docs": agg["n_docs"].astype(np.int64),
                             "posting_hash": ph})

    out = (ds.map_batches(pairs, batch_format="pyarrow")
           .groupby("bucket").map_groups(finalize, batch_format="pandas")
           .to_pandas())
    return (out.sort_values("tok", kind="mergesort")
            .reset_index(drop=True)
            .astype({"n_docs": "int64", "posting_hash": "uint64"}))


def events_value_zscore(sf_dir: str) -> pd.DataFrame:
    """Per-event-type z-score normalization (the feature-scaling pass a
    training pipeline runs before model input): for each event, how
    many standard deviations its value sits from its type's mean, in
    floor'd milli units.

    Exactness discipline: the cross-row moments are EXACT INTEGER sums
    (Σcents, Σcents² — commutative, so block/merge order cannot change
    them); the float math (mean, σ, the per-row z) happens once per row
    from those exact integers, with the identical expression on the
    DuckDB side (IEEE-correctly-rounded /, sqrt on identical doubles →
    identical results). Shape: one tiny groupby for the moments
    (3 int64s per type per block), broadcast, then a pure map-side
    normalize — the second pass streams, nothing shuffles."""
    import ray

    ds = _read(sf_dir, "events", columns=["event_id", "event_type",
                                          "value"])

    def moments(t: pa.Table) -> pa.Table:
        et = np.asarray(t.column("event_type")).astype(object)
        c = np.floor(t.column("value").to_numpy() * 100).astype(np.int64)
        types, inv = np.unique(et, return_inverse=True)
        s = np.zeros(len(types), dtype=np.int64)
        q = np.zeros(len(types), dtype=np.int64)
        np.add.at(s, inv, c)            # int64 adds: exact at any scale
        np.add.at(q, inv, c * c)        # (float-weighted bincount is not)
        return pa.table({
            "event_type": pa.array(list(types), type=pa.string()),
            "n": pa.array(np.bincount(inv).astype(np.int64)),
            "s": pa.array(s),
            "q": pa.array(q)})

    agg = (ds.map_batches(moments, batch_format="pyarrow")
           .groupby("event_type")
           .aggregate(Sum("n", alias_name="n"), Sum("s", alias_name="s"),
                      Sum("q", alias_name="q")).to_pandas())
    idx = pd.Index(agg["event_type"])
    n = agg["n"].to_numpy(np.float64)
    mu = agg["s"].to_numpy(np.float64) / n
    sigma = np.sqrt(agg["q"].to_numpy(np.float64) / n - mu * mu)
    ref = ray.put((idx, mu, sigma))

    def norm(t: pa.Table) -> pa.Table:
        idx_, mu_, sg_ = ray.get(ref)
        et = np.asarray(t.column("event_type")).astype(object)
        c = np.floor(t.column("value").to_numpy() * 100).astype(np.int64)
        i = idx_.get_indexer(pd.Index(et))
        z = (c.astype(np.float64) - mu_[i]) / sg_[i]
        return pa.table({
            "event_id": pa.array(t.column("event_id").to_numpy()
                                 .astype(np.int64)),
            "z_milli": pa.array(np.floor(z * 1000.0).astype(np.int64))})

    out = ds.map_batches(norm, batch_format="pyarrow").to_pandas()
    return out.astype({"event_id": "int64", "z_milli": "int64"})


def user_value_running_total(sf_dir: str) -> pd.DataFrame:
    """Cumulative window (``SUM() OVER (PARTITION BY user ORDER BY ts,
    event_id ROWS UNBOUNDED PRECEDING)``): each user's lifetime
    value-cents total as of each event — the last window-function shape
    missing from the family (rank / lag / ROWS / RANGE live nearby).
    Same bucketed kernel: one ``user_id % 64`` exchange, then one
    global cumsum with per-user resets via the cumcount-anchored
    subtraction trick (cumsum minus the value of the user's first row's
    prefix) — no per-user dispatch."""
    ds = _read(sf_dir, "events", columns=["event_id", "user_id", "ts",
                                          "value"])

    def derive(t: pa.Table) -> pa.Table:
        cents = np.floor(t.column("value").to_numpy() * 100).astype(np.int64)
        b = (t.column("user_id").to_numpy() % 64).astype(np.int32)
        return pa.table({"event_id": t.column("event_id"),
                         "user_id": t.column("user_id"),
                         "ts_us": t.column("ts").cast(pa.int64()),
                         "cents": pa.array(cents),
                         "bucket": pa.array(b)})

    def running(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts_us", "event_id"],
                          kind="mergesort")
        c = g["cents"].to_numpy()
        cs = np.cumsum(c)
        rank = g.groupby("user_id", sort=False).cumcount().to_numpy()
        i = np.arange(len(c))
        first = i - rank                       # index of the user's first row
        base = cs[first] - c[first]            # prefix before the user starts
        return pd.DataFrame({"event_id": g["event_id"].to_numpy(),
                             "user_id": g["user_id"].to_numpy(),
                             "running_cents": cs - base})

    out = (ds.map_batches(derive, batch_format="pyarrow")
           .groupby("bucket").map_groups(running, batch_format="pandas")
           .to_pandas())
    return out.astype({"running_cents": "int64"})


def user_top_event_type(sf_dir: str) -> pd.DataFrame:
    """Per-group MODE (argmax-count aggregate): each user's most
    frequent event type, ties broken alphabetically — the
    ``row_number() over (order by count desc)`` shape SQL uses when an
    engine lacks a native MODE.

    Shape: map-side (user, type) partial counts via one pandas
    crosstab-style groupby per block (the exchange moves one row per
    (user, type, block)); one bucketed ``groupby(user % 64)`` resolves
    the count-sum AND the argmax inside the bucket with C-level
    kernels — the same single-exchange two-level collapse as
    ``q2_min_cost_supplier``."""
    ds = _read(sf_dir, "events", columns=["user_id", "event_type"])

    def partial(t: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "user_id": t.column("user_id").to_numpy().astype(np.int64),
            "event_type": np.asarray(t.column("event_type"))
            .astype(object)})
        g = df.groupby(["user_id", "event_type"], as_index=False).size()
        uid = g["user_id"].to_numpy(np.int64)
        return pa.table({
            "user_id": pa.array(uid),
            "event_type": pa.array(g["event_type"].to_numpy(object),
                                   type=pa.string()),
            "n": pa.array(g["size"].to_numpy(np.int64)),
            "bucket": pa.array((uid % 64).astype(np.int32))})

    def mode(g: pd.DataFrame) -> pd.DataFrame:
        s = g.groupby(["user_id", "event_type"], as_index=False)["n"].sum()
        s = s.sort_values(["user_id", "n", "event_type"],
                          ascending=[True, False, True], kind="mergesort")
        top = s.drop_duplicates("user_id", keep="first")
        return top.rename(columns={"event_type": "top_type",
                                   "n": "n_events"})

    out = (ds.map_batches(partial, batch_format="pyarrow")
           .groupby("bucket").map_groups(mode, batch_format="pandas")
           .to_pandas())
    return (out.sort_values("user_id", kind="mergesort")
            .reset_index(drop=True)
            .astype({"user_id": "int64", "n_events": "int64"}))


def events_weighted_sample(sf_dir: str, n: int = 100) -> pd.DataFrame:
    """Deterministic weighted sampling without replacement (Efraimidis &
    Spirakis 2006 A-ES — public algorithm): each row draws
    ``key = u^(1/w)`` with ``u`` a hash-derived uniform (mix64 of
    event_id — reproducible on re-run/resume, unlike RNG state) and
    ``w`` = value-cents+1; the global top-``n`` keys ARE the weighted
    sample. Distributed: each block keeps its local top-``n`` (same
    (key desc, event_id) order as the final merge, so boundary ties
    prune identically) and the driver merges ≤ n·blocks candidate
    rows — no shuffle at all. Keys are reported as floor(key·1e9);
    ordering uses the full float64 key with event_id tie-break, and
    the golden reproduces the identical IEEE pow/division."""
    from ..functions.hashing import mix64

    ds = _read(sf_dir, "events", columns=["event_id", "value"])

    def local_top(t: pa.Table) -> pa.Table:
        eid = t.column("event_id").to_numpy().astype(np.int64)
        cents = np.floor(t.column("value").to_numpy() * 100).astype(np.int64)
        u = (mix64(eid.astype(np.uint64)).astype(np.float64) + 1.0) \
            / np.float64(2.0 ** 64)
        key = np.power(u, 1.0 / (cents + 1).astype(np.float64))
        order = np.lexsort((eid, -key))[:n]
        return pa.table({
            "event_id": pa.array(eid[order]),
            "key": pa.array(key[order]),
            "w_cents": pa.array(cents[order])})

    cand = ds.map_batches(local_top, batch_format="pyarrow").to_pandas()
    order = np.lexsort((cand["event_id"].to_numpy(np.int64),
                        -cand["key"].to_numpy()))[:n]
    out = cand.iloc[order]
    return pd.DataFrame({
        "event_id": out["event_id"].to_numpy(np.int64),
        "w_cents": out["w_cents"].to_numpy(np.int64),
        "key_e9": np.floor(out["key"].to_numpy() * 1e9).astype(np.int64)})


def events_entropy_per_user(sf_dir: str) -> pd.DataFrame:
    """Per-user Shannon entropy of the event-type distribution (a
    behavioral-diversity feature), in floor'd milli-nats. Exact integer
    counts feed identical float64 ``p·ln p`` terms on both sides; the
    per-user term sums use ``np.add.reduceat`` over the (user, type)
    total order, so rounding is segment-local and block-invariant —
    the same determinism contract as ``lm_bigram_scores``.
    One bucketed ``groupby(user % 64)`` exchange of per-block partial
    counts; everything else is map-side."""
    ds = _read(sf_dir, "events", columns=["user_id", "event_type"])

    def partial(t: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "user_id": t.column("user_id").to_numpy().astype(np.int64),
            "event_type": np.asarray(t.column("event_type"))
            .astype(object)})
        g = df.groupby(["user_id", "event_type"], as_index=False).size()
        uid = g["user_id"].to_numpy(np.int64)
        return pa.table({
            "user_id": pa.array(uid),
            "event_type": pa.array(g["event_type"].to_numpy(object),
                                   type=pa.string()),
            "n": pa.array(g["size"].to_numpy(np.int64)),
            "bucket": pa.array((uid % 64).astype(np.int32))})

    def entropy(g: pd.DataFrame) -> pd.DataFrame:
        s = g.groupby(["user_id", "event_type"], as_index=False)["n"].sum()
        s = s.sort_values(["user_id", "event_type"], kind="mergesort")
        uid = s["user_id"].to_numpy(np.int64)
        c = s["n"].to_numpy(np.int64).astype(np.float64)
        tot = s.groupby("user_id", sort=False)["n"].transform("sum") \
            .to_numpy(np.int64).astype(np.float64)
        p = c / tot
        terms = -p * np.log(p)
        starts = np.flatnonzero(np.r_[True, uid[1:] != uid[:-1]])
        h = np.add.reduceat(terms, starts)
        return pd.DataFrame({
            "user_id": uid[starts],
            "n_events": np.add.reduceat(s["n"].to_numpy(np.int64),
                                        starts),
            "entropy_milli": np.floor(h * 1000.0).astype(np.int64)})

    out = (ds.map_batches(partial, batch_format="pyarrow")
           .groupby("bucket").map_groups(entropy, batch_format="pandas")
           .to_pandas())
    return (out.sort_values("user_id", kind="mergesort")
            .reset_index(drop=True)
            .astype({"user_id": "int64", "n_events": "int64",
                     "entropy_milli": "int64"}))


def returnflag_revenue_salted(sf_dir: str) -> pd.DataFrame:
    """Hot-key salted aggregate, demonstrated as an oracled query: the
    group key (``l_returnflag``) has only 3 values, so a naive groupby
    sends every row of each key through one reducer — the skew that
    stalls a 256-node shuffle. The salt splits each hot key 16 ways
    (``salt = rowhash % 16``), the first exchange reduces (key, salt)
    partials (≤ 48 rows move), and a driver-side fold finishes —
    the same pattern the crawl scheduler applies to Zipf-head hosts
    (``salted_hosts``). Values are identical to the unsalted plan;
    only the exchange shape changes."""
    from ..functions.hashing import mix64

    ds = _read(sf_dir, "lineitem",
               columns=["l_orderkey", "l_linenumber", "l_returnflag",
                        "l_extendedprice", "l_discount"])

    def partial(t: pa.Table) -> pa.Table:
        flag = np.asarray(t.column("l_returnflag")).astype(object)
        price = t.column("l_extendedprice").to_numpy()
        disc = t.column("l_discount").to_numpy()
        cents = np.floor(price * (1 - disc) * 100).astype(np.int64)
        rid = (t.column("l_orderkey").to_numpy().astype(np.uint64)
               * np.uint64(8) +
               t.column("l_linenumber").to_numpy().astype(np.uint64))
        salt = (mix64(rid) % np.uint64(16)).astype(np.int64)
        df = pd.DataFrame({"flag": flag, "salt": salt, "c": cents})
        g = df.groupby(["flag", "salt"], as_index=False).agg(
            c=("c", "sum"), n=("c", "size"))
        return pa.Table.from_pandas(g, preserve_index=False)

    part = (ds.map_batches(partial, batch_format="pyarrow")
            .groupby(["flag", "salt"])
            .aggregate(Sum("c", alias_name="revenue_cents"),
                       Sum("n", alias_name="n_lines"))
            .to_pandas())
    out = part.groupby("flag", as_index=False).agg(
        revenue_cents=("revenue_cents", "sum"),
        n_lines=("n_lines", "sum")).rename(
            columns={"flag": "l_returnflag"})
    return (out.sort_values("l_returnflag", kind="mergesort")
            .reset_index(drop=True)
            .astype({"revenue_cents": "int64", "n_lines": "int64"}))


def _skyline_kernel(price: np.ndarray, size: np.ndarray):
    """Vectorized 2-D skyline (minimize price, maximize size). A point
    is dominated iff another point has price <= and size >= with at
    least one strict. Sweep: per distinct price take the group-max
    size; a point survives iff it holds its price group's max AND that
    max strictly beats the running max over all strictly-cheaper
    prices. Duplicate (price, size) optima all survive (neither
    dominates the other). Returns the surviving indices."""
    df = pd.DataFrame({"p": price, "s": size})
    gmax = df.groupby("p")["s"].transform("max").to_numpy()
    # running max of group-max over strictly smaller prices
    up = np.unique(price)
    per_price_max = df.groupby("p")["s"].max().reindex(up).to_numpy()
    run_before = np.concatenate(
        ([np.iinfo(np.int64).min],
         np.maximum.accumulate(per_price_max)[:-1]))
    before = run_before[np.searchsorted(up, price)]
    keep = (size == gmax) & (size > before)
    return np.flatnonzero(keep)


def part_skyline(sf_dir: str) -> pd.DataFrame:
    """Pareto frontier of parts: no other part is both cheaper-or-equal
    (p_retailprice) and larger-or-equal (p_size) with one strict — the
    classic two-phase distributed skyline. Phase 1 runs the vectorized
    sweep per block (a block's skyline is a superset of its rows'
    global-skyline members, so non-candidates are pruned before any
    exchange); phase 2 re-runs the same kernel on the concatenated
    candidates, which are output-sized (skylines of random data are
    ~log-sized), so the merge is a tiny driver step. At 100 TB the
    phase-1 map prunes ~everything and phase 2 still sees only the
    union of per-block skylines. SQL twin: NOT EXISTS dominance."""
    ds = _read(sf_dir, "part",
               columns=["p_partkey", "p_retailprice", "p_size"])

    def local_sky(t: pa.Table) -> pa.Table:
        price = np.floor(t.column("p_retailprice").to_numpy()
                         * 100).astype(np.int64)
        size = t.column("p_size").to_numpy().astype(np.int64)
        keys = t.column("p_partkey").to_numpy().astype(np.int64)
        idx = _skyline_kernel(price, size)
        return pa.table({"p_partkey": pa.array(keys[idx]),
                         "price_cents": pa.array(price[idx]),
                         "p_size": pa.array(size[idx])})

    cand = ds.map_batches(local_sky, batch_format="pyarrow").to_pandas()
    idx = _skyline_kernel(cand["price_cents"].to_numpy(),
                          cand["p_size"].to_numpy())
    out = cand.iloc[idx].sort_values("p_partkey", kind="mergesort")
    return out.reset_index(drop=True).astype(
        {"p_partkey": "int64", "price_cents": "int64", "p_size": "int64"})


def events_daily_gapfill(sf_dir: str) -> pd.DataFrame:
    """Gap-filled daily event counts per type: every (type, day) cell
    of the full [min day, max day] range appears, zero-filled — the
    dimension-generation + left-join-fill shape dashboards need
    (sparse groupbys silently drop empty buckets). The observed
    aggregate is one grouped exchange; the dense (types × days) frame
    is generated driver-side (it is output-sized by construction) and
    the fill is a vectorized merge."""
    ds = _read(sf_dir, "events", columns=["event_type", "ts"])

    def derive(t: pa.Table) -> pa.Table:
        day = (t.column("ts").cast(pa.int64()).to_numpy()
               // 86_400_000_000).astype(np.int64)
        return pa.table({"event_type": t.column("event_type"),
                         "day": pa.array(day)})

    agg = (ds.map_batches(derive, batch_format="pyarrow")
           .groupby(["event_type", "day"])
           .aggregate(Count(alias_name="n")).to_pandas())
    days = np.arange(agg["day"].min(), agg["day"].max() + 1,
                     dtype=np.int64)
    types = np.sort(agg["event_type"].unique())
    dense = pd.MultiIndex.from_product(
        [types, days], names=["event_type", "day"]).to_frame(index=False)
    out = dense.merge(agg, on=["event_type", "day"], how="left")
    out["n"] = out["n"].fillna(0).astype(np.int64)
    return (out.sort_values(["event_type", "day"], kind="mergesort")
            .reset_index(drop=True).astype({"day": "int64"}))


_PROFILE_COLS = ("l_quantity", "l_extendedprice", "l_discount", "l_tax")


def lineitem_profile(sf_dir: str) -> pd.DataFrame:
    """Data-quality column profiler: one row per numeric column with
    row count, null count, exact distinct count, min and max — the
    ingest-validation pass a pipeline runs before training on a new
    table drop. min/max/count fold from one-row-per-block partials
    (tiny); the exact distinct count is the only real exchange and it
    moves PRE-DEDUPED (column, value) pairs per block (np.unique), so
    its volume is bounded by block-local cardinality, never row count.
    At 100 TB you'd swap the exact-distinct leg for the HLL register
    fold in ``users_per_event_type_hll`` (same shape, constant-size
    partials) — the exact version is the oracle-checkable twin."""
    ds = _read(sf_dir, "lineitem", columns=list(_PROFILE_COLS))

    def stats_partial(t: pa.Table) -> pa.Table:
        cols, n, nn, mn, mx = [], [], [], [], []
        for c in _PROFILE_COLS:
            a = t.column(c)
            v = a.to_numpy(zero_copy_only=False).astype(np.float64)
            null = int(a.null_count)
            ok = v[~np.isnan(v)] if null or np.isnan(v).any() else v
            cols.append(c); n.append(len(v)); nn.append(null)
            mn.append(float(ok.min()) if len(ok) else np.nan)
            mx.append(float(ok.max()) if len(ok) else np.nan)
        return pa.table({"column": pa.array(cols, type=pa.string()),
                         "n": pa.array(n, type=pa.int64()),
                         "n_null": pa.array(nn, type=pa.int64()),
                         "min_v": pa.array(mn, type=pa.float64()),
                         "max_v": pa.array(mx, type=pa.float64())})

    def uniq_partial(t: pa.Table) -> pa.Table:
        # (column, value) packed per block: column index in the top
        # bits, the float64's raw bit pattern hashed into a bucket.
        # Distinct (column, value) pairs are near ROW-sized for a
        # high-cardinality column, and Ray's aggregate pays per group —
        # the fold below is 64 bucketed np.unique reduces instead
        # (same reasoning as the pair folds in joins.py).
        cols, vals = [], []
        for ci, c in enumerate(_PROFILE_COLS):
            u = np.unique(t.column(c).to_numpy(zero_copy_only=False)
                          .astype(np.float64))
            cols.append(np.full(len(u), ci, dtype=np.int64))
            vals.append(u)
        col = np.concatenate(cols)
        bits = np.concatenate(vals).view(np.int64)
        return pa.table({
            "col": pa.array(col),
            "bits": pa.array(bits),
            "vbucket": pa.array(
                (((bits.view(np.uint64)
                    * np.uint64(0x9E3779B97F4A7C15))
                  >> np.uint64(33)) % np.uint64(64))
                .astype(np.int32))})

    def uniq_reduce(g: pd.DataFrame) -> pa.Table:
        # exact distinct per column within the bucket: same float bits
        # always land in the same bucket, so per-bucket uniques sum to
        # the global distinct count
        d = pd.DataFrame({"col": g["col"].to_numpy(),
                          "bits": g["bits"].to_numpy()}) \
            .drop_duplicates()
        out = d.groupby("col", as_index=False).size() \
            .rename(columns={"size": "nd"})
        return pa.Table.from_pandas(out, preserve_index=False)

    base = (ds.map_batches(stats_partial, batch_format="pyarrow")
            .groupby("column")
            .aggregate(Sum("n", alias_name="n"),
                       Sum("n_null", alias_name="n_null"),
                       Min("min_v", alias_name="min_v"),
                       Max("max_v", alias_name="max_v"))
            .to_pandas())
    nd = (ds.map_batches(uniq_partial, batch_format="pyarrow")
          .groupby("vbucket").map_groups(uniq_reduce,
                                         batch_format="pandas")
          .groupby("col").aggregate(Sum("nd", alias_name="n_distinct"))
          .to_pandas())
    nd["column"] = np.array(_PROFILE_COLS, dtype=object)[
        nd["col"].to_numpy(np.int64)]
    nd = nd[["column", "n_distinct"]]
    out = base.merge(nd, on="column")
    return (out.sort_values("column", kind="mergesort")
            .reset_index(drop=True)
            .astype({"n": "int64", "n_null": "int64",
                     "n_distinct": "int64"})
            [["column", "n", "n_null", "n_distinct", "min_v", "max_v"]])


def events_mad_outliers(sf_dir: str) -> pd.DataFrame:
    """Robust anomaly detection per group: median + MAD (median absolute
    deviation) of value-cents per event_type, and the count of events
    beyond 3 MADs — the standard robust outlier gate for metric streams.
    All statistics in INTEGER arithmetic so the SQL twin matches
    bit-exactly: med2 = sorted[(n-1)//2] + sorted[n//2] (= 2×median for
    odd AND even n), mad4 = the same doubling over |2·v − med2|, and the
    outlier test |v − med| > 3·MAD becomes 2·|2·v − med2| > 3·mad4.
    Exact medians need each group's values together (one groupby
    exchange, same envelope as ``events_percentiles``); a
    high-cardinality variant would switch to a mergeable histogram
    sketch."""
    ds = _read(sf_dir, "events", columns=["event_type", "value"])

    def derive(t: pa.Table) -> pa.Table:
        v = np.floor(t.column("value").to_numpy() * 100).astype(np.int64)
        return pa.table({"event_type": t.column("event_type"),
                         "cents": pa.array(v)})

    def mad(g: pd.DataFrame) -> pd.DataFrame:
        v = np.sort(g["cents"].to_numpy())
        n = len(v)
        med2 = int(v[(n - 1) // 2]) + int(v[n // 2])
        dev = np.sort(np.abs(2 * v - med2))
        mad4 = int(dev[(n - 1) // 2]) + int(dev[n // 2])
        n_out = int(np.count_nonzero(2 * dev > 3 * mad4))
        return pd.DataFrame({"event_type": g["event_type"].iloc[:1],
                             "med2_cents": [med2], "mad4_cents": [mad4],
                             "n_outliers": [n_out]})

    out = (ds.map_batches(derive, batch_format="pyarrow")
           .groupby("event_type").map_groups(mad, batch_format="pandas")
           .to_pandas())
    return (out.sort_values("event_type", kind="mergesort")
            .reset_index(drop=True)
            .astype({"med2_cents": "int64", "mad4_cents": "int64",
                     "n_outliers": "int64"}))


def events_moving_sum(sf_dir: str, window: int = 3) -> pd.DataFrame:
    """Rows-frame window function: per-event trailing sum of the last
    ``window`` values (ROWS BETWEEN window-1 PRECEDING AND CURRENT ROW)
    per user, ordered by (ts, event_id) — the moving-metric primitive
    under rate smoothing and burst detection. One ``groupby(user % B)``
    exchange; inside each bucket one C-level sort + pandas grouped
    rolling sum (no Python row loop). Emits one row per input event —
    the output is input-sized, which is fine because it streams straight
    out as a column append; nothing is collected beyond the driver-side
    test harness."""
    ds = _read(sf_dir, "events",
               columns=["event_id", "user_id", "ts", "value"])

    def derive(t: pa.Table) -> pa.Table:
        u = t.column("user_id").to_numpy().astype(np.int64)
        v = np.floor(t.column("value").to_numpy() * 100).astype(np.int64)
        return pa.table({
            "event_id": t.column("event_id"),
            "user_id": pa.array(u),
            "ts_us": t.column("ts").cast(pa.int64()),
            "cents": pa.array(v),
            "bucket": pa.array((u % 64).astype(np.int32))})

    def roll(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts_us", "event_id"],
                          kind="mergesort")
        ms = (g.groupby("user_id", sort=False)["cents"]
              .rolling(window, min_periods=1).sum()
              .reset_index(drop=True).to_numpy())
        return pd.DataFrame({"event_id": g["event_id"].to_numpy(),
                             "msum_cents": ms.astype(np.int64)})

    out = (ds.map_batches(derive, batch_format="pyarrow")
           .groupby("bucket").map_groups(roll, batch_format="pandas")
           .to_pandas())
    return (out.sort_values("event_id", kind="mergesort")
            .reset_index(drop=True)
            .astype({"event_id": "int64", "msum_cents": "int64"}))


def events_value_ewma(sf_dir: str) -> pd.DataFrame:
    """Per-key streaming fold: integer EWMA of value-cents per user in
    (ts, event_id) order — e ← (7·e + v) >> 3 with e₀ = v₀, i.e.
    α = 1/8 in fixed point. The recurrence is inherently sequential PER
    KEY (each step needs the previous), so the cluster shape is
    parallelism ACROSS keys: one ``groupby(user % B)`` exchange, and
    inside each bucket the fold is vectorized across that bucket's
    users — rows are ordered by (position-within-user, user) and the
    loop advances one POSITION per iteration, updating every user still
    alive at that position with one gather/scatter; the Python loop
    count is max-events-per-key, never row count. Integer semantics
    (floor shift) make the result exactly reproducible regardless of
    batch boundaries — oracled against a single-process golden."""
    ds = _read(sf_dir, "events",
               columns=["event_id", "user_id", "ts", "value"])

    def derive(t: pa.Table) -> pa.Table:
        u = t.column("user_id").to_numpy().astype(np.int64)
        v = np.floor(t.column("value").to_numpy() * 100).astype(np.int64)
        return pa.table({
            "event_id": t.column("event_id"),
            "user_id": pa.array(u),
            "ts_us": t.column("ts").cast(pa.int64()),
            "cents": pa.array(v),
            "bucket": pa.array((u % 64).astype(np.int32))})

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts_us", "event_id"],
                          kind="mergesort")
        uid = g["user_id"].to_numpy()
        v = g["cents"].to_numpy()
        urank, uniq = pd.factorize(uid, sort=True)
        # position of each row within its user (rows already user-sorted)
        starts = np.ones(len(uid), dtype=np.int64)
        starts[0] = 0
        starts[1:] = np.where(uid[1:] != uid[:-1], 0, 1)
        pos = np.arange(len(uid)) - \
            np.maximum.accumulate(np.where(starts == 0,
                                           np.arange(len(uid)), -1))
        order = np.lexsort((urank, pos))
        spos = pos[order]
        e = np.zeros(len(uniq), dtype=np.int64)
        bounds = np.searchsorted(spos, np.arange(spos[-1] + 2)) \
            if len(spos) else np.array([0, 0])
        for j in range(len(bounds) - 1):
            lo, hi = bounds[j], bounds[j + 1]
            if lo >= hi:
                break
            ids = urank[order[lo:hi]]
            vals = v[order[lo:hi]]
            if j == 0:
                e[ids] = vals
            else:
                e[ids] = (7 * e[ids] + vals) >> 3
        return pd.DataFrame({"user_id": uniq.astype(np.int64),
                             "ewma_cents": e})

    out = (ds.map_batches(derive, batch_format="pyarrow")
           .groupby("bucket").map_groups(fold, batch_format="pandas")
           .to_pandas())
    return (out.sort_values("user_id", kind="mergesort")
            .reset_index(drop=True)
            .astype({"user_id": "int64", "ewma_cents": "int64"}))


def events_percentile_rank(sf_dir: str) -> pd.DataFrame:
    """Global percent-rank of every event's value — the rank-transform
    primitive under calibration curves and copula features. Two-pass
    broadcast shape (no global sort): pass 1 folds per-block
    ``np.unique`` partials into a (distinct cents → count) table with a
    64-way bucketed reduce (distinct values can approach row count, and
    Ray's aggregate pays per group); the driver turns it into a sorted
    value array + cumulative-count array — DISTINCT-VALUE-sized, the
    same class of broadcast as every LUT join here — and pass 2 maps
    rank = cumcount[searchsorted(value)] over the events.
    pct_bp = n_less · 10000 // (N−1), all-integer, ties share a rank
    (SQL RANK() semantics, bit-exact twin). At a scale where distinct
    values outgrow the driver, the fold keys on value directly and
    pass 2 becomes a range-partitioned merge join against the CDF
    table — same algebra."""
    ds = _read(sf_dir, "events", columns=["event_id", "value"])

    def vc_partial(t: pa.Table) -> pa.Table:
        v = np.floor(t.column("value").to_numpy() * 100).astype(np.int64)
        u, c = np.unique(v, return_counts=True)
        return pa.table({"cents": pa.array(u),
                         "n": pa.array(c.astype(np.int64)),
                         "vbucket": pa.array((u % 64).astype(np.int32))})

    def vc_reduce(g: pd.DataFrame) -> pa.Table:
        out = g.groupby("cents", as_index=False)["n"].sum()
        return pa.Table.from_pandas(out, preserve_index=False)

    vc = (ds.map_batches(vc_partial, batch_format="pyarrow")
          .groupby("vbucket").map_groups(vc_reduce, batch_format="pandas")
          .to_pandas().sort_values("cents", kind="mergesort"))
    vals = vc["cents"].to_numpy(np.int64)
    cum = np.concatenate(([0], np.cumsum(vc["n"].to_numpy(np.int64))))
    n_total = int(cum[-1])
    import ray
    vals_ref = ray.put(vals)
    cum_ref = ray.put(cum[:-1])

    def rank(t: pa.Table) -> pa.Table:
        va = ray.get(vals_ref)
        cu = ray.get(cum_ref)
        v = np.floor(t.column("value").to_numpy() * 100).astype(np.int64)
        n_less = cu[np.searchsorted(va, v)]
        bp = n_less * 10000 // (n_total - 1)
        return pa.table({"event_id": t.column("event_id"),
                         "pct_bp": pa.array(bp)})

    out = ds.map_batches(rank, batch_format="pyarrow").to_pandas()
    return (out.sort_values("event_id", kind="mergesort")
            .reset_index(drop=True)
            .astype({"event_id": "int64", "pct_bp": "int64"}))


def lineitem_corr(sf_dir: str) -> pd.DataFrame:
    """Per-group Pearson correlation (quantity vs price dollars) from
    EXACT integer moment sums — the feature-correlation scan of a data
    audit. Each block emits one (flag, n, Σx, Σy, Σxy, Σx², Σy²) row
    per group (constant-size partials, the classic mergeable-moments
    shape, so the exchange is |groups|×|blocks| rows no matter the
    input size); the driver folds them and evaluates the closed form
    in float64 with the SAME operation order as the SQL twin
    (each int64 cast to double, then identical IEEE multiply/subtract/
    sqrt/divide — bit-equal results, no libm log involved).
    corr_milli = floor(1000·corr)."""
    ds = _read(sf_dir, "lineitem",
               columns=["l_returnflag", "l_quantity", "l_extendedprice"])

    def moments(t: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "flag": t.column("l_returnflag").to_pylist(),
            "x": np.floor(t.column("l_quantity").to_numpy())
            .astype(np.int64),
            "y": np.floor(t.column("l_extendedprice").to_numpy())
            .astype(np.int64)})
        df["xy"] = df["x"] * df["y"]
        df["xx"] = df["x"] * df["x"]
        df["yy"] = df["y"] * df["y"]
        df["n"] = 1
        g = df.groupby("flag", as_index=False).sum()
        return pa.Table.from_pandas(g, preserve_index=False)

    agg = (ds.map_batches(moments, batch_format="pyarrow")
           .groupby("flag")
           .aggregate(Sum("n", alias_name="n"),
                      Sum("x", alias_name="sx"),
                      Sum("y", alias_name="sy"),
                      Sum("xy", alias_name="sxy"),
                      Sum("xx", alias_name="sxx"),
                      Sum("yy", alias_name="syy"))
           .to_pandas())
    dn = agg["n"].to_numpy(np.int64).astype(np.float64)
    dsx = agg["sx"].to_numpy(np.int64).astype(np.float64)
    dsy = agg["sy"].to_numpy(np.int64).astype(np.float64)
    num = (dn * agg["sxy"].to_numpy(np.int64).astype(np.float64)
           - dsx * dsy)
    va = dn * agg["sxx"].to_numpy(np.int64).astype(np.float64) \
        - dsx * dsx
    vb = dn * agg["syy"].to_numpy(np.int64).astype(np.float64) \
        - dsy * dsy
    corr_milli = np.floor(num / (np.sqrt(va) * np.sqrt(vb)) * 1000.0) \
        .astype(np.int64)
    out = pd.DataFrame({"l_returnflag": agg["flag"],
                        "n": agg["n"].to_numpy(np.int64),
                        "corr_milli": corr_milli})
    return (out.sort_values("l_returnflag", kind="mergesort")
            .reset_index(drop=True).astype({"n": "int64"}))


def supplier_top_parts(sf_dir: str, topn: int = 3) -> pd.DataFrame:
    """Per-group top-N (top parts per supplier by shipped quantity,
    ties to the smaller part key) — the grouped-leaderboard shape.
    Block-local (supp, part, qty) partials pre-aggregate the exchange;
    one ``groupby(supp % B)`` co-locates each supplier, and the
    per-bucket top-N is one vectorized sort + C-level grouped head —
    no per-supplier Python loop. Output is |suppliers|·N rows."""
    ds = _read(sf_dir, "lineitem",
               columns=["l_suppkey", "l_partkey", "l_quantity"])

    def partial(t: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "s": t.column("l_suppkey").to_numpy().astype(np.int64),
            "p": t.column("l_partkey").to_numpy().astype(np.int64),
            "q": np.floor(t.column("l_quantity").to_numpy())
            .astype(np.int64)})
        g = df.groupby(["s", "p"], as_index=False)["q"].sum()
        g["bucket"] = (g["s"] % 64).astype(np.int32)
        return pa.Table.from_pandas(g, preserve_index=False)

    def top(g: pd.DataFrame) -> pa.Table:
        g = g.groupby(["s", "p"], as_index=False)["q"].sum()
        g = g.sort_values(["s", "q", "p"],
                          ascending=[True, False, True],
                          kind="mergesort")
        g["rank"] = g.groupby("s", sort=False).cumcount() + 1
        out = g[g["rank"] <= topn]
        return pa.Table.from_pandas(out, preserve_index=False)

    out = (ds.map_batches(partial, batch_format="pyarrow")
           .groupby("bucket").map_groups(top, batch_format="pandas")
           .to_pandas()
           .rename(columns={"s": "l_suppkey", "p": "l_partkey",
                            "q": "total_qty"}))
    return (out.sort_values(["l_suppkey", "rank"], kind="mergesort")
            .reset_index(drop=True)
            .astype({"l_suppkey": "int64", "l_partkey": "int64",
                     "total_qty": "int64", "rank": "int64"}))


def events_nearby_count(sf_dir: str,
                        window_us: int = 300_000_000) -> pd.DataFrame:
    """Temporal self range-join: for every event, how many OTHER
    events the same user produced within ±5 minutes — the burst /
    velocity feature under rate limiting and fraud scoring. A
    fact×fact interval join: one ``groupby(user % B)`` exchange, then
    per user segment two ``np.searchsorted`` calls bound the window in
    the user's time-sorted array (count = hi − lo − 1, exact, ties
    inclusive). The loop is over KEYS in the bucket (the recurrence is
    per-key like ``events_value_ewma``); every per-key step is a
    vectorized bisect over that key's whole segment. SQL twin: LEFT
    self-join on user with the |Δts| predicate."""
    ds = _read(sf_dir, "events", columns=["event_id", "user_id", "ts"])

    def derive(t: pa.Table) -> pa.Table:
        u = t.column("user_id").to_numpy().astype(np.int64)
        return pa.table({
            "event_id": t.column("event_id"),
            "user_id": pa.array(u),
            "ts_us": t.column("ts").cast(pa.int64()),
            "bucket": pa.array((u % 64).astype(np.int32))})

    def count_window(g: pd.DataFrame) -> pa.Table:
        g = g.sort_values(["user_id", "ts_us"], kind="mergesort")
        uid = g["user_id"].to_numpy()
        ts = g["ts_us"].to_numpy()
        eid = g["event_id"].to_numpy()
        starts = np.flatnonzero(np.r_[True, uid[1:] != uid[:-1]])
        ends = np.r_[starts[1:], len(uid)]
        n = np.empty(len(uid), dtype=np.int64)
        for s, e in zip(starts, ends):
            seg = ts[s:e]
            lo = np.searchsorted(seg, seg - window_us, side="left")
            hi = np.searchsorted(seg, seg + window_us, side="right")
            n[s:e] = hi - lo - 1
        return pa.table({"event_id": pa.array(eid),
                         "n_nearby": pa.array(n)})

    out = (ds.map_batches(derive, batch_format="pyarrow")
           .groupby("bucket").map_groups(count_window,
                                         batch_format="pandas")
           .to_pandas())
    return (out.sort_values("event_id", kind="mergesort")
            .reset_index(drop=True)
            .astype({"event_id": "int64", "n_nearby": "int64"}))


def lineitem_fingerprint(sf_dir: str) -> pd.DataFrame:
    """Order-invariant distributed table fingerprint: per-row integer
    hash of the lineitem key columns folded into (row count, SUM,
    BIT_XOR) — the standard cheap equality check for verifying a copy /
    migration / replication of a huge table without moving it (compare
    two 100-TB tables by exchanging three integers).

    Ray shape: the ideal scale profile — each block reduces to ONE
    fixed-size partial row inside ``map_batches`` (pure uint64 numpy,
    no strings), there is NO shuffle at all, and the driver folds B
    tiny partials. Commutative/associative combiners (sum, xor) make
    the result independent of block order, so it is stable across
    block splits, cluster sizes and retries.

    Arithmetic is kept exactly SQL-twin-reproducible: every step stays
    below 2^52 (mod 2^31-1 Mersenne fold, multiplier 1000003), so the
    DuckDB BIGINT twin computes bit-identical values. The per-block
    SUM of <2^31 values bounds at rows·2^31; the driver fold uses
    Python ints, and the twin's global SUM fits BIGINT up to ~4×10^9
    rows — past that, compare the xor and per-shard sums instead (the
    partials parquet is the shard-level artifact you'd diff)."""
    M = np.uint64(2147483647)  # 2^31 - 1
    C = np.uint64(1000003)
    ds = _read(sf_dir, "lineitem",
               columns=["l_orderkey", "l_linenumber",
                        "l_partkey", "l_suppkey"])

    def partial(t: pa.Table) -> pa.Table:
        a = t.column("l_orderkey").to_numpy().astype(np.uint64)
        b = t.column("l_linenumber").to_numpy().astype(np.uint64)
        c = t.column("l_partkey").to_numpy().astype(np.uint64)
        d = t.column("l_suppkey").to_numpy().astype(np.uint64)
        v = (a % M * C + b) % M
        v = (v * C + c) % M
        v = (v * C + d) % M
        x = np.bitwise_xor.reduce(v) if len(v) else np.uint64(0)
        return pa.table({"n": pa.array([len(v)], type=pa.int64()),
                         "s": pa.array([int(v.sum())], type=pa.int64()),
                         "x": pa.array([int(x)], type=pa.int64())})

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    xor = 0
    for val in parts["x"].to_numpy(np.int64):
        xor ^= int(val)
    return pd.DataFrame({"n_rows": [int(parts["n"].sum())],
                         "checksum_sum": [int(parts["s"].sum())],
                         "checksum_xor": [xor]}).astype("int64")


def events_hist_quantiles(sf_dir: str) -> pd.DataFrame:
    """EXACT global quantiles of value-cents in two linear passes with
    ZERO shuffle — the distributed counting-sort answer to "quantiles
    over 100 TB": pass 1 folds per-block (min, max, n) partials (three
    ints per block); pass 2 folds per-block dense histograms over the
    [min, max] cent range (one fixed-size int64 vector per block, summed
    on the driver like a gradient all-reduce). The cumulative histogram
    then answers ANY discrete quantile exactly — same
    ``sorted[ceil(q·n)-1]`` convention as :func:`events_percentiles`, so
    the DuckDB ``quantile_disc`` twin matches bit-exactly. The histogram
    width is the VALUE range (cents), not the row count, so it stays
    driver-sized at any data scale; a range too wide to bin densely
    would switch to the same fold over fixed-width coarse bands plus a
    per-band second pass (radix-style refinement), not to a sort."""
    ds = _read(sf_dir, "events", columns=["value"])

    def derive(t: pa.Table) -> pa.Table:
        v = np.floor(t.column("value").to_numpy() * 100).astype(np.int64)
        return pa.table({"cents": pa.array(v)})

    cds = ds.map_batches(derive, batch_format="pyarrow").materialize()

    def mm_partial(t: pa.Table) -> pa.Table:
        v = t.column("cents").to_numpy()
        return pa.table({"lo": pa.array([int(v.min())], type=pa.int64()),
                         "hi": pa.array([int(v.max())], type=pa.int64()),
                         "n": pa.array([len(v)], type=pa.int64())})

    mm = cds.map_batches(mm_partial, batch_format="pyarrow").to_pandas()
    lo, hi = int(mm["lo"].min()), int(mm["hi"].max())
    n = int(mm["n"].sum())

    def hist_partial(t: pa.Table) -> pa.Table:
        v = t.column("cents").to_numpy()
        cnt = np.bincount(v - lo, minlength=hi - lo + 1).astype(np.int64)
        return pa.table({"v": pa.array([cnt.tobytes()],
                                       type=pa.large_binary())})

    total = np.zeros(hi - lo + 1, dtype=np.int64)
    for row in (cds.map_batches(hist_partial, batch_format="pyarrow")
                .take_all()):
        total += np.frombuffer(row["v"], dtype=np.int64)

    cum = np.cumsum(total)
    qs = [25, 50, 75, 90, 99]
    cents = [lo + int(np.searchsorted(cum, -(-q * n // 100)))
             for q in qs]
    return pd.DataFrame({"q_pct": pd.array(qs, dtype="int64"),
                         "cents": pd.array(cents, dtype="int64")})


def events_ntile(sf_dir: str, k: int = 4) -> pd.DataFrame:
    """Exact global NTILE(k) over the total order (value-cents,
    event_id) — the equal-frequency binning primitive under calibration
    buckets and quantile features. Same two-pass broadcast shape as
    ``events_percentile_rank``: pass 1 folds per-block ``np.unique``
    partials into the distinct-value CDF (driver-side, distinct-value
    sized — broadcastable); pass 2 is ONE ``groupby(cents % B)``
    exchange of (cents, event_id) pairs where each bucket resolves the
    intra-tie order by event_id vectorized (sort + segment-start
    subtraction), so every row gets its exact 0-based global row number
    r = n_less(cents) + intra_rank. The tile follows SQL NTILE
    semantics exactly — the first (N mod k) tiles hold ceil(N/k) rows:
    tile = r // (base+1) while r < rem·(base+1), else
    rem + (r − rem·(base+1)) // base. All integer, bit-exact vs the
    DuckDB window twin; no global sort anywhere."""
    ds = _read(sf_dir, "events", columns=["event_id", "value"])

    def vc_partial(t: pa.Table) -> pa.Table:
        v = np.floor(t.column("value").to_numpy() * 100).astype(np.int64)
        u, c = np.unique(v, return_counts=True)
        return pa.table({"cents": pa.array(u),
                         "n": pa.array(c.astype(np.int64)),
                         "vbucket": pa.array((u % 64).astype(np.int32))})

    def vc_reduce(g: pd.DataFrame) -> pa.Table:
        out = g.groupby("cents", as_index=False)["n"].sum()
        return pa.Table.from_pandas(out, preserve_index=False)

    vc = (ds.map_batches(vc_partial, batch_format="pyarrow")
          .groupby("vbucket").map_groups(vc_reduce, batch_format="pandas")
          .to_pandas().sort_values("cents", kind="mergesort"))
    vals = vc["cents"].to_numpy(np.int64)
    cum = np.concatenate(([0], np.cumsum(vc["n"].to_numpy(np.int64))))
    n_total = int(cum[-1])
    base, rem = n_total // k, n_total % k
    cut = rem * (base + 1)
    import ray
    vals_ref = ray.put(vals)
    cum_ref = ray.put(cum[:-1])

    def derive(t: pa.Table) -> pa.Table:
        v = np.floor(t.column("value").to_numpy() * 100).astype(np.int64)
        return pa.table({"event_id": t.column("event_id"),
                         "cents": pa.array(v),
                         "bucket": pa.array((v % 64).astype(np.int32))})

    def assign(g: pd.DataFrame) -> pd.DataFrame:
        va = ray.get(vals_ref)
        cu = ray.get(cum_ref)
        c = g["cents"].to_numpy(np.int64)
        eid = g["event_id"].to_numpy(np.int64)
        order = np.lexsort((eid, c))
        cs, es = c[order], eid[order]
        seg = np.empty(len(cs), dtype=bool)
        if len(cs):
            seg[0] = True
            seg[1:] = cs[1:] != cs[:-1]
        idx = np.arange(len(cs))
        seg_start = np.maximum.accumulate(np.where(seg, idx, -1))
        intra = idx - seg_start
        r = cu[np.searchsorted(va, cs)] + intra
        tile = np.where(r < cut, r // (base + 1),
                        rem + (r - cut) // max(base, 1)) + 1
        return pd.DataFrame({"event_id": es, "ntile": tile.astype(np.int64)})

    out = (ds.map_batches(derive, batch_format="pyarrow")
           .groupby("bucket").map_groups(assign, batch_format="pandas")
           .to_pandas())
    return (out.sort_values("event_id", kind="mergesort")
            .reset_index(drop=True)
            .astype({"event_id": "int64", "ntile": "int64"}))


def user_active_seconds(sf_dir: str) -> pd.DataFrame:
    """Interval-union coverage per user (gaps-and-islands): each event
    opens an activity interval [ts, ts + value-cents seconds]; the
    operator merges overlapping intervals per user and reports total
    covered time and the number of maximal islands — the
    session-coverage primitive under engagement metrics and SLA uptime.
    ONE ``groupby(user % B)`` exchange of fixed-width (user, start, end)
    triples; inside each bucket the sweep is fully vectorized: lexsort
    by (user, start, end), a segment-reset running max of interval ends
    (the offset trick — add per-user offsets larger than any end so the
    cummax never carries across users), island starts where
    start > previous running max, and per-island coverage by indexed
    gather — no Python row loop. All integer microseconds; bit-exact vs
    the DuckDB islands window twin."""
    ds = _read(sf_dir, "events", columns=["user_id", "ts", "value"])

    def derive(t: pa.Table) -> pa.Table:
        u = t.column("user_id").to_numpy().astype(np.int64)
        s = t.column("ts").cast(pa.int64()).to_numpy()
        dur = np.floor(t.column("value").to_numpy() * 100).astype(np.int64)
        return pa.table({
            "user_id": pa.array(u),
            "s": pa.array(s),
            "e": pa.array(s + dur * 1_000_000),
            "bucket": pa.array((u % 64).astype(np.int32))})

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        u = g["user_id"].to_numpy(np.int64)
        s = g["s"].to_numpy(np.int64)
        e = g["e"].to_numpy(np.int64)
        order = np.lexsort((e, s, u))
        u, s, e = u[order], s[order], e[order]
        newu = np.empty(len(u), dtype=bool)
        newu[0] = True
        newu[1:] = u[1:] != u[:-1]
        seg_id = np.cumsum(newu) - 1
        off = int(e.max()) + 1          # ends are positive epoch micros
        rm = np.maximum.accumulate(e + seg_id * off) - seg_id * off
        prev_rm = np.empty_like(rm)
        prev_rm[0] = 0
        prev_rm[1:] = rm[:-1]
        start = newu | (s > prev_rm)
        last = np.empty(len(u), dtype=bool)
        last[:-1] = start[1:]
        last[-1] = True
        cover = rm[last] - s[start]     # islands in order
        iu = u[start]
        uniq, inv = np.unique(iu, return_inverse=True)
        active = np.bincount(inv, weights=cover).astype(np.int64)
        n_isl = np.bincount(inv).astype(np.int64)
        return pd.DataFrame({"user_id": uniq, "active_us": active,
                             "n_islands": n_isl})

    out = (ds.map_batches(derive, batch_format="pyarrow")
           .groupby("bucket").map_groups(fold, batch_format="pandas")
           .to_pandas())
    return (out.sort_values("user_id", kind="mergesort")
            .reset_index(drop=True)
            .astype({"user_id": "int64", "active_us": "int64",
                     "n_islands": "int64"}))


def user_first_last(sf_dir: str) -> pd.DataFrame:
    """Ordered first/last aggregate per user: the type of each user's
    first and last event under the total order (ts, event_id), plus the
    last-minus-first value delta in cents — the entry/exit-state scan
    of funnel and churn features. Two-phase candidate shape: each block
    emits at most TWO rows per user it sees (block-local first and
    last, picked by one vectorized lexsort + segment boundaries), so
    the ``groupby(user % B)`` exchange carries ~2·|users|·|blocks| rows
    no matter the input size; the bucket fold re-runs the identical
    boundary pick over candidates. No Python row loop anywhere."""
    ds = _read(sf_dir, "events",
               columns=["event_id", "user_id", "ts", "event_type",
                        "value"])

    def _pick(u, ts, eid):
        order = np.lexsort((eid, ts, u))
        us = u[order]
        first = np.empty(len(us), dtype=bool)
        if len(us):
            first[0] = True
            first[1:] = us[1:] != us[:-1]
        last = np.empty(len(us), dtype=bool)
        last[:-1] = first[1:]
        last[-1] = True
        return order, first, last

    def partial(t: pa.Table) -> pa.Table:
        u = t.column("user_id").to_numpy().astype(np.int64)
        if not len(u):
            return pa.table({"user_id": pa.array([], type=pa.int64()),
                             "ts_us": pa.array([], type=pa.int64()),
                             "event_id": pa.array([], type=pa.int64()),
                             "event_type": pa.array([], type=pa.string()),
                             "cents": pa.array([], type=pa.int64()),
                             "bucket": pa.array([], type=pa.int32())})
        ts = t.column("ts").cast(pa.int64()).to_numpy()
        eid = t.column("event_id").to_numpy().astype(np.int64)
        order, first, last = _pick(u, ts, eid)
        keep = order[first | last]
        cents = np.floor(t.column("value").to_numpy() * 100).astype(np.int64)
        return pa.table({
            "user_id": pa.array(u[keep]),
            "ts_us": pa.array(ts[keep]),
            "event_id": pa.array(eid[keep]),
            "event_type": t.column("event_type").take(pa.array(keep)),
            "cents": pa.array(cents[keep]),
            "bucket": pa.array((u[keep] % 64).astype(np.int32))})

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        u = g["user_id"].to_numpy(np.int64)
        ts = g["ts_us"].to_numpy(np.int64)
        eid = g["event_id"].to_numpy(np.int64)
        order, first, last = _pick(u, ts, eid)
        et = g["event_type"].to_numpy()[order]
        cents = g["cents"].to_numpy(np.int64)[order]
        us = u[order]
        return pd.DataFrame({
            "user_id": us[first],
            "first_type": et[first],
            "last_type": et[last],
            "delta_cents": cents[last] - cents[first]})

    out = (ds.map_batches(partial, batch_format="pyarrow")
           .groupby("bucket").map_groups(fold, batch_format="pandas")
           .to_pandas())
    return (out.sort_values("user_id", kind="mergesort")
            .reset_index(drop=True)
            .astype({"user_id": "int64", "delta_cents": "int64"}))


def lineitem_regr(sf_dir: str) -> pd.DataFrame:
    """Per-group OLS fit (price dollars on quantity) from EXACT integer
    moment sums — the distributed linear-regression / trend-feature
    primitive. Same constant-size mergeable-moments shape as
    ``lineitem_corr``: each block emits one (flag, n, Σx, Σy, Σxy, Σx²,
    Σy²) row per group, the exchange is |groups|×|blocks| rows no
    matter the input size, and the driver evaluates the closed forms
    slope = (nΣxy−ΣxΣy)/(nΣxx−Σx²),
    intercept = (ΣyΣxx−ΣxΣxy)/(nΣxx−Σx²),
    r² = (nΣxy−ΣxΣy)²/((nΣxx−Σx²)(nΣyy−Σy²))
    in float64 with the SAME IEEE operation order as the SQL twin —
    bit-equal fixed-point outputs. int64 moment sums hold to ~1e9 rows
    at these magnitudes; beyond that the partials widen to float64
    (Kahan) or int128 without changing the exchange shape."""
    ds = _read(sf_dir, "lineitem",
               columns=["l_returnflag", "l_quantity", "l_extendedprice"])

    def moments(t: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "flag": t.column("l_returnflag").to_pylist(),
            "x": np.floor(t.column("l_quantity").to_numpy())
            .astype(np.int64),
            "y": np.floor(t.column("l_extendedprice").to_numpy())
            .astype(np.int64)})
        df["xy"] = df["x"] * df["y"]
        df["xx"] = df["x"] * df["x"]
        df["yy"] = df["y"] * df["y"]
        df["n"] = 1
        g = df.groupby("flag", as_index=False).sum()
        return pa.Table.from_pandas(g, preserve_index=False)

    agg = (ds.map_batches(moments, batch_format="pyarrow")
           .groupby("flag")
           .aggregate(Sum("n", alias_name="n"),
                      Sum("x", alias_name="sx"),
                      Sum("y", alias_name="sy"),
                      Sum("xy", alias_name="sxy"),
                      Sum("xx", alias_name="sxx"),
                      Sum("yy", alias_name="syy"))
           .to_pandas())
    dn = agg["n"].to_numpy(np.int64).astype(np.float64)
    dsx = agg["sx"].to_numpy(np.int64).astype(np.float64)
    dsy = agg["sy"].to_numpy(np.int64).astype(np.float64)
    dsxy = agg["sxy"].to_numpy(np.int64).astype(np.float64)
    dsxx = agg["sxx"].to_numpy(np.int64).astype(np.float64)
    dsyy = agg["syy"].to_numpy(np.int64).astype(np.float64)
    num = dn * dsxy - dsx * dsy
    den = dn * dsxx - dsx * dsx
    vb = dn * dsyy - dsy * dsy
    slope_micro = np.floor((num / den) * 1000000.0).astype(np.int64)
    inum = dsy * dsxx - dsx * dsxy
    intercept_micro = np.floor((inum / den) * 1000000.0).astype(np.int64)
    r2_milli = np.floor(((num * num) / (den * vb)) * 1000.0) \
        .astype(np.int64)
    out = pd.DataFrame({"l_returnflag": agg["flag"],
                        "n": agg["n"].to_numpy(np.int64),
                        "slope_micro": slope_micro,
                        "intercept_micro": intercept_micro,
                        "r2_milli": r2_milli})
    return (out.sort_values("l_returnflag", kind="mergesort")
            .reset_index(drop=True).astype({"n": "int64"}))


_HOUR_US = 3_600_000_000


def events_ohlc(sf_dir: str) -> pd.DataFrame:
    """Per-(user, hour) OHLC bars: open/close are the first/last
    value-cents under the total order (ts, event_id), high/low the
    extremes — the time-series resampling (downsample-to-bars)
    primitive. Mergeable-aggregate shape: each block emits ONE partial
    row per (user, hour) it sees (block-local open/close candidates
    with their order keys, plus high/low/n), picked by one vectorized
    lexsort + reduceat; the ``groupby(user % B)`` exchange then carries
    ~|user·hour groups|×|blocks| fixed-width rows, and the bucket fold
    re-runs the identical candidate pick over partials. No Python row
    loop anywhere."""
    ds = _read(sf_dir, "events",
               columns=["event_id", "user_id", "ts", "value"])

    def partial(t: pa.Table) -> pa.Table:
        u = t.column("user_id").to_numpy().astype(np.int64)
        if not len(u):
            e64 = pa.array([], type=pa.int64())
            return pa.table({"user_id": e64, "hour_id": e64,
                             "f_ts": e64, "f_eid": e64, "open_cents": e64,
                             "l_ts": e64, "l_eid": e64, "close_cents": e64,
                             "high_cents": e64, "low_cents": e64, "n": e64,
                             "bucket": pa.array([], type=pa.int32())})
        ts = t.column("ts").cast(pa.int64()).to_numpy()
        eid = t.column("event_id").to_numpy().astype(np.int64)
        cents = np.floor(t.column("value").to_numpy() * 100) \
            .astype(np.int64)
        hour = ts // _HOUR_US
        pack = u * (1 << 32) + hour
        order = np.lexsort((eid, ts, pack))
        pk, tss, eids, cs = pack[order], ts[order], eid[order], cents[order]
        first = np.empty(len(pk), dtype=bool)
        first[0] = True
        first[1:] = pk[1:] != pk[:-1]
        starts = np.flatnonzero(first)
        ends = np.append(starts[1:], len(pk)) - 1
        return pa.table({
            "user_id": pa.array(pk[starts] >> 32),
            "hour_id": pa.array(pk[starts] & ((1 << 32) - 1)),
            "f_ts": pa.array(tss[starts]), "f_eid": pa.array(eids[starts]),
            "open_cents": pa.array(cs[starts]),
            "l_ts": pa.array(tss[ends]), "l_eid": pa.array(eids[ends]),
            "close_cents": pa.array(cs[ends]),
            "high_cents": pa.array(np.maximum.reduceat(cs, starts)),
            "low_cents": pa.array(np.minimum.reduceat(cs, starts)),
            "n": pa.array(ends - starts + 1),
            "bucket": pa.array(((pk[starts] >> 32) % 64).astype(np.int32))})

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        u = g["user_id"].to_numpy(np.int64)
        h = g["hour_id"].to_numpy(np.int64)
        pack = u * (1 << 32) + h
        fo = np.lexsort((g["f_eid"].to_numpy(np.int64),
                         g["f_ts"].to_numpy(np.int64), pack))
        pf = pack[fo]
        first = np.empty(len(pf), dtype=bool)
        first[0] = True
        first[1:] = pf[1:] != pf[:-1]
        starts = np.flatnonzero(first)
        ends = np.append(starts[1:], len(pf)) - 1
        lo = np.lexsort((g["l_eid"].to_numpy(np.int64),
                         g["l_ts"].to_numpy(np.int64), pack))
        hi_s = g["high_cents"].to_numpy(np.int64)[fo]
        lo_s = g["low_cents"].to_numpy(np.int64)[fo]
        n_s = g["n"].to_numpy(np.int64)[fo]
        csum = np.concatenate(([0], np.cumsum(n_s)))
        return pd.DataFrame({
            "user_id": pf[starts] >> 32,
            "hour_id": pf[starts] & ((1 << 32) - 1),
            "open_cents": g["open_cents"].to_numpy(np.int64)[fo][starts],
            "high_cents": np.maximum.reduceat(hi_s, starts),
            "low_cents": np.minimum.reduceat(lo_s, starts),
            "close_cents": g["close_cents"].to_numpy(np.int64)[lo][ends],
            "n": csum[np.append(starts[1:], len(pf))] - csum[starts]})

    out = (ds.map_batches(partial, batch_format="pyarrow")
           .groupby("bucket").map_groups(fold, batch_format="pandas")
           .to_pandas())
    return (out.sort_values(["user_id", "hour_id"], kind="mergesort")
            .reset_index(drop=True)
            .astype({c: "int64" for c in out.columns}))


def user_band_runs(sf_dir: str, band_cents: int = 2000) -> pd.DataFrame:
    """SCD2-style change tracking (gaps-and-islands over an attribute):
    each user's value-band (cents // band_cents) history is collapsed
    into maximal runs of consecutive equal band under the total order
    (ts, event_id), emitting one validity row per run — the
    slowly-changing-dimension interval builder. ONE ``groupby(user %
    B)`` exchange of fixed-width rows co-locates each user's history;
    the in-bucket sweep is fully vectorized (lexsort, boundary masks,
    cumsum run ids, flatnonzero gather — no Python row loop).
    Partitioning assumption (shared with the other per-user ops): one
    user's history fits a bucket."""
    ds = _read(sf_dir, "events",
               columns=["event_id", "user_id", "ts", "value"])

    def derive(t: pa.Table) -> pa.Table:
        u = t.column("user_id").to_numpy().astype(np.int64)
        cents = np.floor(t.column("value").to_numpy() * 100) \
            .astype(np.int64)
        return pa.table({
            "user_id": pa.array(u),
            "ts_us": t.column("ts").cast(pa.int64()),
            "event_id": t.column("event_id"),
            "band": pa.array(cents // band_cents),
            "bucket": pa.array((u % 64).astype(np.int32))})

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        u = g["user_id"].to_numpy(np.int64)
        ts = g["ts_us"].to_numpy(np.int64)
        eid = g["event_id"].to_numpy(np.int64)
        band = g["band"].to_numpy(np.int64)
        order = np.lexsort((eid, ts, u))
        u, ts, band = u[order], ts[order], band[order]
        newu = np.empty(len(u), dtype=bool)
        newu[0] = True
        newu[1:] = u[1:] != u[:-1]
        brk = newu.copy()
        brk[1:] |= band[1:] != band[:-1]
        runid = np.cumsum(brk)                      # 1-based global run id
        ustart = np.maximum.accumulate(np.where(newu, runid, 0))
        starts = np.flatnonzero(brk)
        ends = np.append(starts[1:], len(u)) - 1
        return pd.DataFrame({
            "user_id": u[starts],
            "run_idx": (runid - ustart + 1)[starts],
            "band": band[starts],
            "from_us": ts[starts],
            "to_us": ts[ends],
            "n_events": ends - starts + 1})

    out = (ds.map_batches(derive, batch_format="pyarrow")
           .groupby("bucket").map_groups(fold, batch_format="pandas")
           .to_pandas())
    return (out.sort_values(["user_id", "run_idx"], kind="mergesort")
            .reset_index(drop=True)
            .astype({c: "int64" for c in out.columns}))


def event_transitions(sf_dir: str) -> pd.DataFrame:
    """Global Markov transition counts over per-user event sequences
    (the order-2 sequence-mining / session-model primitive): each
    consecutive pair of a user's events under the total order (ts,
    event_id) contributes one (from_type, to_type) observation. ONE
    ``groupby(user % B)`` exchange co-locates each user's history; the
    in-bucket pairing is a vectorized shift (lexsort + same-user mask),
    and each bucket emits |types|² partial counts that the driver folds
    — the exchange carries the events once, the fold output is
    transition-matrix-sized."""
    ds = _read(sf_dir, "events",
               columns=["event_id", "user_id", "ts", "event_type"])

    def derive(t: pa.Table) -> pa.Table:
        u = t.column("user_id").to_numpy().astype(np.int64)
        return pa.table({
            "user_id": pa.array(u),
            "ts_us": t.column("ts").cast(pa.int64()),
            "event_id": t.column("event_id"),
            "event_type": t.column("event_type"),
            "bucket": pa.array((u % 64).astype(np.int32))})

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        u = g["user_id"].to_numpy(np.int64)
        ts = g["ts_us"].to_numpy(np.int64)
        eid = g["event_id"].to_numpy(np.int64)
        order = np.lexsort((eid, ts, u))
        us = u[order]
        et = g["event_type"].to_numpy()[order]
        same = np.empty(len(us), dtype=bool)
        same[0] = False
        same[1:] = us[1:] == us[:-1]
        idx = np.flatnonzero(same)
        pairs = pd.DataFrame({"from_type": et[idx - 1],
                              "to_type": et[idx]})
        out = pairs.groupby(["from_type", "to_type"],
                            as_index=False).size()
        return out.rename(columns={"size": "n"})

    parts = (ds.map_batches(derive, batch_format="pyarrow")
             .groupby("bucket").map_groups(fold, batch_format="pandas")
             .to_pandas())
    out = parts.groupby(["from_type", "to_type"], as_index=False)["n"] \
        .sum()
    return (out.sort_values(["from_type", "to_type"], kind="mergesort")
            .reset_index(drop=True).astype({"n": "int64"}))


def embedding_dim_stats(sf_dir: str) -> pd.DataFrame:
    """Per-dimension corpus statistics of the embedding column (the
    feature-drift / normalization-constant monitor): exact fixed-point
    (1e-6) sums and sum-of-squares per dimension. Each block emits ONE
    fixed-size partial (two dim-length int64 vectors packed as binary,
    like the histogram folds) — ZERO shuffle, driver folds block
    partials like a gradient all-reduce; the reduction is
    dimension-sized regardless of row count. Arrow list values are
    flattened zero-copy and reshaped (fixed-length vectors), floored in
    float64 so the SQL twin's DOUBLE arithmetic is bit-identical."""
    ds = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet",
                               columns=["embedding"])

    def partial(t: pa.Table) -> pa.Table:
        arr = t.column("embedding").combine_chunks()
        flat = arr.flatten().to_numpy(zero_copy_only=False)
        dim = len(flat) // len(arr)
        fp = np.floor(flat.astype(np.float64) * 1000000.0) \
            .astype(np.int64).reshape(-1, dim)
        return pa.table({
            "n": pa.array([fp.shape[0]], type=pa.int64()),
            "s": pa.array([fp.sum(axis=0).tobytes()],
                          type=pa.large_binary()),
            "sq": pa.array([(fp * fp).sum(axis=0).tobytes()],
                           type=pa.large_binary())})

    rows = ds.map_batches(partial, batch_format="pyarrow").take_all()
    n = sum(int(r["n"]) for r in rows)
    s = np.sum([np.frombuffer(r["s"], dtype=np.int64) for r in rows],
               axis=0)
    sq = np.sum([np.frombuffer(r["sq"], dtype=np.int64) for r in rows],
                axis=0)
    return pd.DataFrame({
        "dim": np.arange(1, len(s) + 1, dtype=np.int64),
        "n": np.full(len(s), n, dtype=np.int64),
        "sum_fp": s.astype(np.int64),
        "sumsq_fp": sq.astype(np.int64)})


def events_value_winsorized(sf_dir: str, lo_pct: int = 5,
                            hi_pct: int = 95) -> pd.DataFrame:
    """Winsorization (percentile clipping) of the value column — the
    outlier-robust feature-cleaning transform: values below the exact
    p05 / above the exact p95 are clamped to those quantiles. The
    quantiles come from the same ZERO-shuffle dense-histogram fold as
    ``events_hist_quantiles`` (per-block int64 count vectors summed on
    the driver, ``sorted[ceil(q·n)-1]`` discrete convention matching
    ``quantile_disc``); the clip itself is one stateless vectorized map
    pass — the whole operator streams with no exchange at any scale."""
    ds = _read(sf_dir, "events", columns=["event_id", "value"])

    def derive(t: pa.Table) -> pa.Table:
        v = np.floor(t.column("value").to_numpy() * 100).astype(np.int64)
        return pa.table({"event_id": t.column("event_id"),
                         "cents": pa.array(v)})

    cds = ds.map_batches(derive, batch_format="pyarrow").materialize()

    def mm_partial(t: pa.Table) -> pa.Table:
        v = t.column("cents").to_numpy()
        return pa.table({"lo": pa.array([int(v.min())], type=pa.int64()),
                         "hi": pa.array([int(v.max())], type=pa.int64()),
                         "n": pa.array([len(v)], type=pa.int64())})

    mm = cds.map_batches(mm_partial, batch_format="pyarrow").to_pandas()
    lo, hi = int(mm["lo"].min()), int(mm["hi"].max())
    n = int(mm["n"].sum())

    def hist_partial(t: pa.Table) -> pa.Table:
        v = t.column("cents").to_numpy()
        cnt = np.bincount(v - lo, minlength=hi - lo + 1).astype(np.int64)
        return pa.table({"v": pa.array([cnt.tobytes()],
                                       type=pa.large_binary())})

    total = np.zeros(hi - lo + 1, dtype=np.int64)
    for row in (cds.map_batches(hist_partial, batch_format="pyarrow")
                .take_all()):
        total += np.frombuffer(row["v"], dtype=np.int64)
    cum = np.cumsum(total)
    p_lo = lo + int(np.searchsorted(cum, -(-lo_pct * n // 100)))
    p_hi = lo + int(np.searchsorted(cum, -(-hi_pct * n // 100)))

    def clip(t: pa.Table) -> pa.Table:
        c = t.column("cents").to_numpy()
        return pa.table({"event_id": t.column("event_id"),
                         "w_cents": pa.array(np.clip(c, p_lo, p_hi))})

    out = cds.map_batches(clip, batch_format="pyarrow").to_pandas()
    return (out.sort_values("event_id", kind="mergesort")
            .reset_index(drop=True)
            .astype({"event_id": "int64", "w_cents": "int64"}))


def events_chi2_cells(sf_dir: str, band_cents: int = 10000) -> pd.DataFrame:
    """Chi-square independence test cells between event_type and the
    value band (cents // band_cents) — the categorical-association
    screen of feature audits. Contingency counts come from per-block
    (type, band, n) partials folded on the driver (cell-count-sized,
    |types|×|bands|, regardless of rows — zero Ray shuffle); each
    OBSERVED cell's chi-square contribution (N·O − r·c)²/(N·r·c) is
    then evaluated in EXACT arbitrary-precision integer arithmetic
    (micro fixed-point), mirrored by HUGEINT arithmetic in the SQL
    twin — no float summation order to disagree on. Zero-observed
    cells are omitted on both sides (documented: contributions of
    structural zeros are not part of this operator's contract)."""
    ds = _read(sf_dir, "events", columns=["event_type", "value"])

    def partial(t: pa.Table) -> pa.Table:
        cents = np.floor(t.column("value").to_numpy() * 100) \
            .astype(np.int64)
        df = pd.DataFrame({"event_type": t.column("event_type")
                           .to_pylist(),
                           "band": cents // band_cents})
        g = df.groupby(["event_type", "band"], as_index=False).size()
        return pa.Table.from_pandas(
            g.rename(columns={"size": "n"}), preserve_index=False)

    parts = (ds.map_batches(partial, batch_format="pyarrow")
             .to_pandas())
    obs = parts.groupby(["event_type", "band"], as_index=False)["n"].sum()
    rt = obs.groupby("event_type")["n"].sum()
    ct = obs.groupby("band")["n"].sum()
    big_n = int(obs["n"].sum())
    contrib = []
    for et, band, o in obs.itertuples(index=False):   # |cells| rows only
        r, c, oo = int(rt[et]), int(ct[band]), int(o)
        d = big_n * oo - r * c
        contrib.append((d * d * 1000000) // (big_n * r * c))
    out = pd.DataFrame({"event_type": obs["event_type"],
                        "band": obs["band"].astype("int64"),
                        "observed": obs["n"].astype("int64"),
                        "chi2_micro": pd.array(contrib, dtype="int64")})
    return (out.sort_values(["event_type", "band"], kind="mergesort")
            .reset_index(drop=True))


def user_twap(sf_dir: str) -> pd.DataFrame:
    """Time-weighted average partials per user (the TWAP / financial
    last-observation-carried-forward integral): each consecutive event
    pair under (ts, event_id) contributes cents·gap_seconds; the
    operator reports the exact integer numerator and denominator so the
    caller divides at whatever precision it wants (keeping both sides
    of the oracle in int64). ONE ``groupby(user % B)`` exchange; the
    in-bucket LEAD is a vectorized shift over the lexsorted rows; users
    with a single event have no gap and are absent on both sides by
    definition. Gap flooring to whole seconds bounds the products well
    inside int64 (5e4 cents × 3e7 s × 1e2 events/user ≈ 1e14)."""
    ds = _read(sf_dir, "events",
               columns=["event_id", "user_id", "ts", "value"])

    def derive(t: pa.Table) -> pa.Table:
        u = t.column("user_id").to_numpy().astype(np.int64)
        cents = np.floor(t.column("value").to_numpy() * 100) \
            .astype(np.int64)
        return pa.table({
            "user_id": pa.array(u),
            "ts_us": t.column("ts").cast(pa.int64()),
            "event_id": t.column("event_id"),
            "cents": pa.array(cents),
            "bucket": pa.array((u % 64).astype(np.int32))})

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        u = g["user_id"].to_numpy(np.int64)
        ts = g["ts_us"].to_numpy(np.int64)
        eid = g["event_id"].to_numpy(np.int64)
        c = g["cents"].to_numpy(np.int64)
        order = np.lexsort((eid, ts, u))
        us, tss, cs = u[order], ts[order], c[order]
        same = np.empty(len(us), dtype=bool)
        if len(us):
            same[:-1] = us[1:] == us[:-1]
            same[-1] = False
        idx = np.flatnonzero(same)                 # row has a successor
        gap = (tss[idx + 1] - tss[idx]) // 1_000_000
        df = pd.DataFrame({"user_id": us[idx],
                           "num": cs[idx] * gap, "den": gap})
        out = df.groupby("user_id", as_index=False).agg(
            twap_num=("num", "sum"), twap_den=("den", "sum"),
            n_gaps=("num", "size"))
        return out

    out = (ds.map_batches(derive, batch_format="pyarrow")
           .groupby("bucket").map_groups(fold, batch_format="pandas")
           .to_pandas())
    return (out.sort_values("user_id", kind="mergesort")
            .reset_index(drop=True)
            .astype({c: "int64" for c in out.columns}))


def events_rolling_outliers(sf_dir: str, w: int = 20,
                            k: int = 3) -> pd.DataFrame:
    """Rolling z-score anomaly flags per user (the streaming
    anomaly-detection primitive): an event is an outlier when its
    value deviates from the mean of the user's previous ≤w events by
    more than k standard deviations. The test is evaluated ENTIRELY in
    integers — (n·c − s)² > k²·n·(n·sq − s²)/n² rearranged to
    (n·c − s)² > k²·(n·sq − s²) — so there is no float variance to
    disagree on with the SQL window twin. ONE ``groupby(user % B)``
    exchange; in-bucket rolling sums are per-user-reset prefix-sum
    differences (cumsum + clamped window starts), fully vectorized.
    Events with fewer than 2 prior observations are reported
    is_outlier = 0 (flat rule on both sides)."""
    ds = _read(sf_dir, "events",
               columns=["event_id", "user_id", "ts", "value"])

    def derive(t: pa.Table) -> pa.Table:
        u = t.column("user_id").to_numpy().astype(np.int64)
        cents = np.floor(t.column("value").to_numpy() * 100) \
            .astype(np.int64)
        return pa.table({
            "user_id": pa.array(u),
            "ts_us": t.column("ts").cast(pa.int64()),
            "event_id": t.column("event_id"),
            "cents": pa.array(cents),
            "bucket": pa.array((u % 64).astype(np.int32))})

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        u = g["user_id"].to_numpy(np.int64)
        ts = g["ts_us"].to_numpy(np.int64)
        eid = g["event_id"].to_numpy(np.int64)
        c = g["cents"].to_numpy(np.int64)
        order = np.lexsort((eid, ts, u))
        us, cs, eids = u[order], c[order], eid[order]
        newu = np.empty(len(us), dtype=bool)
        newu[0] = True
        newu[1:] = us[1:] != us[:-1]
        idx = np.arange(len(us))
        ustart = np.maximum.accumulate(np.where(newu, idx, -1))
        lo = np.maximum(ustart, idx - w)            # window [lo, i)
        pre = np.concatenate(([0], np.cumsum(cs)))
        pre2 = np.concatenate(([0], np.cumsum(cs * cs)))
        n = idx - lo
        s = pre[idx] - pre[lo]
        sq = pre2[idx] - pre2[lo]
        lhs = (n * cs - s) ** 2
        rhs = k * k * (n * sq - s * s)
        flag = np.where(n >= 2, (lhs > rhs).astype(np.int64), 0)
        return pd.DataFrame({"event_id": eids, "is_outlier": flag})

    out = (ds.map_batches(derive, batch_format="pyarrow")
           .groupby("bucket").map_groups(fold, batch_format="pandas")
           .to_pandas())
    return (out.sort_values("event_id", kind="mergesort")
            .reset_index(drop=True)
            .astype({"event_id": "int64", "is_outlier": "int64"}))


def user_path_freq(sf_dir: str, depth: int = 5) -> pd.DataFrame:
    """Funnel-path frequency mining: each user's first ``depth`` event
    types (under (ts, event_id)) are joined into a '>'-separated path
    string, then paths are counted across users — the entry-journey
    distribution of product analytics. ONE ``groupby(user % B)``
    exchange; the per-user rank mask is vectorized (index minus
    propagated segment start), the string join is a C-level pandas
    groupby-agg over the ≤depth·|bucket users| surviving rows, and the
    bucket emits path partial counts the driver folds (path-cardinality
    sized). Path-count output is bounded by |types|^depth regardless of
    input rows."""
    ds = _read(sf_dir, "events",
               columns=["event_id", "user_id", "ts", "event_type"])

    def derive(t: pa.Table) -> pa.Table:
        u = t.column("user_id").to_numpy().astype(np.int64)
        return pa.table({
            "user_id": pa.array(u),
            "ts_us": t.column("ts").cast(pa.int64()),
            "event_id": t.column("event_id"),
            "event_type": t.column("event_type"),
            "bucket": pa.array((u % 64).astype(np.int32))})

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        u = g["user_id"].to_numpy(np.int64)
        ts = g["ts_us"].to_numpy(np.int64)
        eid = g["event_id"].to_numpy(np.int64)
        order = np.lexsort((eid, ts, u))
        us = u[order]
        et = g["event_type"].to_numpy()[order]
        newu = np.empty(len(us), dtype=bool)
        newu[0] = True
        newu[1:] = us[1:] != us[:-1]
        idx = np.arange(len(us))
        ustart = np.maximum.accumulate(np.where(newu, idx, -1))
        keep = (idx - ustart) < depth
        df = pd.DataFrame({"user_id": us[keep], "t": et[keep]})
        paths = df.groupby("user_id", sort=True)["t"] \
            .agg(lambda x: ">".join(x))
        return paths.value_counts().rename_axis("path") \
            .reset_index(name="n_users")

    parts = (ds.map_batches(derive, batch_format="pyarrow")
             .groupby("bucket").map_groups(fold, batch_format="pandas")
             .to_pandas())
    out = parts.groupby("path", as_index=False)["n_users"].sum()
    return (out.sort_values("path", kind="mergesort")
            .reset_index(drop=True).astype({"n_users": "int64"}))


def events_dow_hour_heatmap(sf_dir: str) -> pd.DataFrame:
    """Seasonality heatmap: event count and cents volume per
    (day-of-week, hour-of-day) cell — the traffic-profile rollup behind
    capacity planning and politeness-budget shaping. Day-of-week is
    derived in pure integer arithmetic from epoch microseconds
    ((days + 4) % 7, DuckDB's 0=Sunday convention — 1970-01-01 was a
    Thursday) so there is no calendar library to disagree with the SQL
    twin. 168 output cells: one direct Ray aggregate (map-side combine
    makes the exchange |cells|×|blocks|)."""
    ds = _read(sf_dir, "events", columns=["ts", "value"])

    def derive(t: pa.Table) -> pa.Table:
        us = t.column("ts").cast(pa.int64()).to_numpy()
        cents = np.floor(t.column("value").to_numpy() * 100) \
            .astype(np.int64)
        days = us // 86_400_000_000
        return pa.table({
            "dow": pa.array((days + 4) % 7),
            "hour": pa.array((us // _HOUR_US) % 24),
            "cents": pa.array(cents),
            "one": pa.array(np.ones(len(us), dtype=np.int64))})

    out = (ds.map_batches(derive, batch_format="pyarrow")
           .groupby(["dow", "hour"])
           .aggregate(Sum("one", alias_name="n"),
                      Sum("cents", alias_name="sum_cents"))
           .to_pandas())
    return (out.sort_values(["dow", "hour"], kind="mergesort")
            .reset_index(drop=True)
            .astype({c: "int64" for c in out.columns}))


def part_abc(sf_dir: str) -> pd.DataFrame:
    """ABC / Pareto classification of parts by discounted revenue: 'A'
    while the cumulative share (ordered by revenue desc, partkey asc)
    stays ≤80%, 'B' to ≤95%, else 'C' — the inventory-prioritization
    primitive. The heavy input collapses to a part-cardinality rollup
    via per-block packed-key partials + one bucketed reduce (the same
    shape as the other high-cardinality folds); the cumulative-share
    sweep then runs on the ROLLUP (|parts| rows, orders of magnitude
    below the fact table — the documented driver-size assumption, same
    as the skyline/top-k finishes), with the share test in exact
    integer cross-multiplication (cum·5 ≤ tot·4), never a float
    percentage."""
    ds = _read(sf_dir, "lineitem",
               columns=["l_partkey", "l_extendedprice", "l_discount"])

    def partial(t: pa.Table) -> pa.Table:
        pk = t.column("l_partkey").to_numpy().astype(np.int64)
        rev = np.floor(t.column("l_extendedprice").to_numpy()
                       * (1 - t.column("l_discount").to_numpy())
                       * 100).astype(np.int64)
        u, inv = np.unique(pk, return_inverse=True)
        s = np.bincount(inv, weights=rev).astype(np.int64)
        return pa.table({"l_partkey": pa.array(u),
                         "rev": pa.array(s),
                         "bucket": pa.array((u % 64).astype(np.int32))})

    def reduce_bucket(g: pd.DataFrame) -> pa.Table:
        out = g.groupby("l_partkey", as_index=False)["rev"].sum()
        return pa.Table.from_pandas(out, preserve_index=False)

    roll = (ds.map_batches(partial, batch_format="pyarrow")
            .groupby("bucket").map_groups(reduce_bucket,
                                          batch_format="pandas")
            .to_pandas())
    pk = roll["l_partkey"].to_numpy(np.int64)
    rev = roll["rev"].to_numpy(np.int64)
    order = np.lexsort((pk, -rev))
    cum = np.cumsum(rev[order])
    tot = int(cum[-1])
    cls = np.where(cum * 5 <= tot * 4, "A",
                   np.where(cum * 20 <= tot * 19, "B", "C"))
    out = pd.DataFrame({"l_partkey": pk[order], "rev": rev[order],
                        "cls": cls})
    return (out.sort_values("l_partkey", kind="mergesort")
            .reset_index(drop=True)
            .astype({"l_partkey": "int64", "rev": "int64"}))


_DAY_US = 86_400_000_000


def user_daily_locf(sf_dir: str) -> pd.DataFrame:
    """Point-in-time daily feature grid with last-observation-carried-
    forward (the leakage-safe feature-store primitive): for every user
    and every day in the corpus range, the value-cents of that user's
    latest event strictly before the day's end; (user, day) cells
    before the user's first event are absent (inner as-of semantics on
    both sides). Ties at one timestamp resolve to the largest event_id
    (a per-(user, ts) keep-latest dedup first). Global day range comes
    from a zero-shuffle min/max fold; then ONE ``groupby(user % B)``
    exchange and a fully vectorized in-bucket as-of: bucket-local DENSE
    user codes are packed into the high bits above the 52-bit
    microsecond timestamps so one ``np.searchsorted`` resolves every
    (user, day-end) probe at once — no per-user loop. Dense codes keep
    the packing safe at any global user cardinality provided B scales
    with users (≤2^11 users per bucket), the same partitioning
    assumption the other per-user ops document."""
    ds = _read(sf_dir, "events",
               columns=["event_id", "user_id", "ts", "value"])

    def derive(t: pa.Table) -> pa.Table:
        u = t.column("user_id").to_numpy().astype(np.int64)
        cents = np.floor(t.column("value").to_numpy() * 100) \
            .astype(np.int64)
        return pa.table({
            "user_id": pa.array(u),
            "ts_us": t.column("ts").cast(pa.int64()),
            "event_id": t.column("event_id"),
            "cents": pa.array(cents),
            "bucket": pa.array((u % 64).astype(np.int32))})

    eds = ds.map_batches(derive, batch_format="pyarrow").materialize()

    def mm_partial(t: pa.Table) -> pa.Table:
        ts = t.column("ts_us").to_numpy()
        return pa.table({"lo": pa.array([int(ts.min())], type=pa.int64()),
                         "hi": pa.array([int(ts.max())], type=pa.int64())})

    mm = eds.map_batches(mm_partial, batch_format="pyarrow").to_pandas()
    day_lo = int(mm["lo"].min()) // _DAY_US
    day_hi = int(mm["hi"].max()) // _DAY_US
    days = np.arange(day_lo, day_hi + 1, dtype=np.int64)

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        u = g["user_id"].to_numpy(np.int64)
        ts = g["ts_us"].to_numpy(np.int64)
        eid = g["event_id"].to_numpy(np.int64)
        c = g["cents"].to_numpy(np.int64)
        order = np.lexsort((eid, ts, u))
        us, tss, cs = u[order], ts[order], c[order]
        lastdup = np.empty(len(us), dtype=bool)      # keep-latest per (u,ts)
        lastdup[:-1] = (us[1:] != us[:-1]) | (tss[1:] != tss[:-1])
        lastdup[-1] = True
        us, tss, cs = us[lastdup], tss[lastdup], cs[lastdup]
        uniq, inv = np.unique(us, return_inverse=True)
        k, d = len(uniq), len(days)
        pe = inv * (1 << 52) + tss
        pg = np.repeat(np.arange(k, dtype=np.int64), d) * (1 << 52) \
            + np.tile((days + 1) * _DAY_US, k)
        idx = np.searchsorted(pe, pg, side="left") - 1
        gu_dense = np.repeat(np.arange(k, dtype=np.int64), d)
        valid = (idx >= 0)
        safe_idx = np.maximum(idx, 0)
        valid &= (pe[safe_idx] >> 52) == gu_dense
        return pd.DataFrame({
            "user_id": np.repeat(uniq, d)[valid],
            "day_id": np.tile(days, k)[valid],
            "cents_locf": cs[safe_idx][valid]})

    out = (eds.groupby("bucket").map_groups(fold, batch_format="pandas")
           .to_pandas())
    return (out.sort_values(["user_id", "day_id"], kind="mergesort")
            .reset_index(drop=True)
            .astype({c: "int64" for c in out.columns}))


def order_concentration(sf_dir: str) -> pd.DataFrame:
    """Order revenue-concentration distribution: for each order, the
    share of its largest line in basis points ((max·10000)//total,
    exact integer), bucketed by thousands — the skew-diagnostic
    histogram of basket composition. Per-block packed-key partials
    (order, Σrev, max rev) pre-collapse the exchange; one
    ``groupby(order % B)`` reduce finishes per-order totals and each
    bucket emits an 11-cell histogram partial the driver folds —
    output is constant-size regardless of rows."""
    ds = _read(sf_dir, "lineitem",
               columns=["l_orderkey", "l_extendedprice", "l_discount"])

    def partial(t: pa.Table) -> pa.Table:
        ok = t.column("l_orderkey").to_numpy().astype(np.int64)
        rev = np.floor(t.column("l_extendedprice").to_numpy()
                       * (1 - t.column("l_discount").to_numpy())
                       * 100).astype(np.int64)
        u, inv = np.unique(ok, return_inverse=True)
        tot = np.bincount(inv, weights=rev).astype(np.int64)
        mx = np.full(len(u), np.iinfo(np.int64).min, dtype=np.int64)
        np.maximum.at(mx, inv, rev)
        return pa.table({"l_orderkey": pa.array(u),
                         "tot": pa.array(tot), "mx": pa.array(mx),
                         "bucket": pa.array((u % 64).astype(np.int32))})

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        r = g.groupby("l_orderkey").agg(tot=("tot", "sum"),
                                        mx=("mx", "max"))
        bkt = ((r["mx"].to_numpy(np.int64) * 10000)
               // r["tot"].to_numpy(np.int64)) // 1000
        cnt = np.bincount(bkt, minlength=11).astype(np.int64)
        return pd.DataFrame({"bps_bucket": np.arange(11, dtype=np.int64),
                             "n_orders": cnt})

    parts = (ds.map_batches(partial, batch_format="pyarrow")
             .groupby("bucket").map_groups(fold, batch_format="pandas")
             .to_pandas())
    out = parts.groupby("bps_bucket", as_index=False)["n_orders"].sum()
    out = out[out["n_orders"] > 0]
    return (out.sort_values("bps_bucket", kind="mergesort")
            .reset_index(drop=True)
            .astype({"bps_bucket": "int64", "n_orders": "int64"}))


def events_quantiles_by_type(sf_dir: str) -> pd.DataFrame:
    """Per-group EXACT quantiles (p25/p50/p75/p90 of value-cents per
    event_type) — the grouped flavor of ``events_hist_quantiles`` and
    the calibration-table primitive: per-block partials are one dense
    int64 histogram per (block, type) packed as binary over the global
    [min, max] cent range, the driver folds |types| histograms
    (value-range-sized, never row-sized — ZERO Ray shuffle), and every
    quantile is answered from the cumulative histogram with the same
    ``sorted[ceil(q·n)-1]`` convention as ``quantile_disc``. Works at
    any row count while |types|×range stays driver-sized; a wider
    range would switch to radix-style coarse-band refinement like the
    global version documents."""
    ds = _read(sf_dir, "events", columns=["event_type", "value"])

    def derive(t: pa.Table) -> pa.Table:
        v = np.floor(t.column("value").to_numpy() * 100).astype(np.int64)
        return pa.table({"event_type": t.column("event_type"),
                         "cents": pa.array(v)})

    cds = ds.map_batches(derive, batch_format="pyarrow").materialize()

    def mm_partial(t: pa.Table) -> pa.Table:
        v = t.column("cents").to_numpy()
        return pa.table({"lo": pa.array([int(v.min())], type=pa.int64()),
                         "hi": pa.array([int(v.max())], type=pa.int64())})

    mm = cds.map_batches(mm_partial, batch_format="pyarrow").to_pandas()
    lo, hi = int(mm["lo"].min()), int(mm["hi"].max())
    width = hi - lo + 1

    def hist_partial(t: pa.Table) -> pa.Table:
        et = t.column("event_type").to_numpy(zero_copy_only=False)
        v = t.column("cents").to_numpy()
        types, inv = np.unique(et, return_inverse=True)
        blobs = []
        for i in range(len(types)):               # |types| per block only
            cnt = np.bincount(v[inv == i] - lo,
                              minlength=width).astype(np.int64)
            blobs.append(cnt.tobytes())
        return pa.table({"event_type": pa.array(types),
                         "h": pa.array(blobs, type=pa.large_binary())})

    acc: dict = {}
    for row in (cds.map_batches(hist_partial, batch_format="pyarrow")
                .take_all()):
        h = np.frombuffer(row["h"], dtype=np.int64)
        k = row["event_type"]
        acc[k] = acc[k] + h if k in acc else h.copy()
    rows = []
    for k in sorted(acc):
        cum = np.cumsum(acc[k])
        n = int(cum[-1])
        qs = [lo + int(np.searchsorted(cum, -(-q * n // 100)))
              for q in (25, 50, 75, 90)]
        rows.append((k, *qs))
    return pd.DataFrame(rows, columns=["event_type", "p25_cents",
                                       "p50_cents", "p75_cents",
                                       "p90_cents"]) \
        .astype({c: "int64" for c in ["p25_cents", "p50_cents",
                                      "p75_cents", "p90_cents"]})


def customer_order_gap_median(sf_dir: str) -> pd.DataFrame:
    """Per-customer median inter-order gap in whole days (the
    purchase-cadence / churn-risk feature): consecutive orders under
    (o_orderdate, o_orderkey) yield day gaps; the reported median is
    the exact discrete ``quantile_disc(0.5)`` (lower median,
    ``sorted[ceil(n/2)-1]``). ONE ``groupby(cust % B)`` exchange; the
    in-bucket sweep is two lexsorts — one to form per-customer gaps by
    vectorized shift, one to order gaps per customer so every
    customer's median is a single indexed gather off segment offsets —
    no Python per-customer loop. Customers with one order have no gap
    and are absent on both sides."""
    ds = _read(sf_dir, "orders",
               columns=["o_orderkey", "o_custkey", "o_orderdate"])

    def derive(t: pa.Table) -> pa.Table:
        c = t.column("o_custkey").to_numpy().astype(np.int64)
        return pa.table({
            "o_custkey": pa.array(c),
            "d_us": t.column("o_orderdate").cast(pa.int64()),
            "o_orderkey": t.column("o_orderkey"),
            "bucket": pa.array((c % 64).astype(np.int32))})

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        c = g["o_custkey"].to_numpy(np.int64)
        d = g["d_us"].to_numpy(np.int64)
        ok = g["o_orderkey"].to_numpy(np.int64)
        order = np.lexsort((ok, d, c))
        cs, dsd = c[order], d[order]
        same = np.empty(len(cs), dtype=bool)
        if len(cs):
            same[:-1] = cs[1:] == cs[:-1]
            same[-1] = False
        idx = np.flatnonzero(same)
        gc = cs[idx]
        gap = (dsd[idx + 1] - dsd[idx]) // _DAY_US
        o2 = np.lexsort((gap, gc))
        gc, gap = gc[o2], gap[o2]
        first = np.empty(len(gc), dtype=bool)
        if len(gc):
            first[0] = True
            first[1:] = gc[1:] != gc[:-1]
        starts = np.flatnonzero(first)
        ends = np.append(starts[1:], len(gc))
        n = ends - starts
        med = gap[starts + (n + 1) // 2 - 1]
        return pd.DataFrame({"o_custkey": gc[starts],
                             "median_gap_days": med, "n_gaps": n})

    out = (ds.map_batches(derive, batch_format="pyarrow")
           .groupby("bucket").map_groups(fold, batch_format="pandas")
           .to_pandas())
    return (out.sort_values("o_custkey", kind="mergesort")
            .reset_index(drop=True)
            .astype({c: "int64" for c in out.columns}))


def events_burst_max(sf_dir: str) -> pd.DataFrame:
    """Peak burst per user: the maximum number of the user's events in
    any value-anchored sliding hour [ts_i, ts_i + 1h] — the rate-spike
    / abuse-detection primitive. ONE ``groupby(user % B)`` exchange;
    in-bucket, both window edges resolve with global searchsorted over
    the (user·2^52 + ts) packed order (the same dense-safe packing as
    ``user_daily_locf``: counts never cross users because the probe
    keys carry the user in the high bits), then a per-user max by
    ``np.maximum.reduceat`` — no Python loop. Matches the SQL RANGE
    window (value-range frames include timestamp ties on both
    sides)."""
    ds = _read(sf_dir, "events", columns=["user_id", "ts"])

    def derive(t: pa.Table) -> pa.Table:
        u = t.column("user_id").to_numpy().astype(np.int64)
        return pa.table({
            "user_id": pa.array(u),
            "ts_us": t.column("ts").cast(pa.int64()),
            "bucket": pa.array((u % 64).astype(np.int32))})

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        u = g["user_id"].to_numpy(np.int64)
        ts = g["ts_us"].to_numpy(np.int64)
        order = np.lexsort((ts, u))
        us, tss = u[order], ts[order]
        uniq, inv = np.unique(us, return_inverse=True)
        pk = inv * (1 << 52) + tss
        left = np.searchsorted(pk, pk, side="left")
        right = np.searchsorted(pk, inv * (1 << 52) + tss + _HOUR_US,
                                side="right")
        cnt = right - left
        starts = np.flatnonzero(np.concatenate(
            ([True], inv[1:] != inv[:-1])))
        return pd.DataFrame({
            "user_id": uniq,
            "max_burst": np.maximum.reduceat(cnt, starts),
            "n_events": np.bincount(inv).astype(np.int64)})

    out = (ds.map_batches(derive, batch_format="pyarrow")
           .groupby("bucket").map_groups(fold, batch_format="pandas")
           .to_pandas())
    return (out.sort_values("user_id", kind="mergesort")
            .reset_index(drop=True)
            .astype({c: "int64" for c in out.columns}))


def events_autocorr_lag1(sf_dir: str) -> pd.DataFrame:
    """Per-user lag-1 autocorrelation of the value sequence (the
    burstiness / momentum feature of behavioral modeling): Pearson
    correlation between consecutive cents pairs under (ts, event_id),
    from EXACT integer moment sums over the pairs — the sequential twin
    of ``lineitem_corr``. ONE ``groupby(user % B)`` exchange; pairs are
    a vectorized same-user shift; per-user moments are C-level grouped
    sums; the closed form is evaluated in float64 with the SAME IEEE
    operation order as the SQL twin (bit-equal milli fixed-point).
    Users whose pair variance is zero on either side are excluded by an
    exact INTEGER predicate (va > 0 AND vb > 0), so no NaN ever crosses
    the oracle."""
    ds = _read(sf_dir, "events",
               columns=["event_id", "user_id", "ts", "value"])

    def derive(t: pa.Table) -> pa.Table:
        u = t.column("user_id").to_numpy().astype(np.int64)
        cents = np.floor(t.column("value").to_numpy() * 100) \
            .astype(np.int64)
        return pa.table({
            "user_id": pa.array(u),
            "ts_us": t.column("ts").cast(pa.int64()),
            "event_id": t.column("event_id"),
            "cents": pa.array(cents),
            "bucket": pa.array((u % 64).astype(np.int32))})

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        u = g["user_id"].to_numpy(np.int64)
        ts = g["ts_us"].to_numpy(np.int64)
        eid = g["event_id"].to_numpy(np.int64)
        c = g["cents"].to_numpy(np.int64)
        order = np.lexsort((eid, ts, u))
        us, cs = u[order], c[order]
        same = np.empty(len(us), dtype=bool)
        if len(us):
            same[:-1] = us[1:] == us[:-1]
            same[-1] = False
        i = np.flatnonzero(same)
        x, y, uu = cs[i], cs[i + 1], us[i]
        df = pd.DataFrame({"user_id": uu, "n": 1, "sx": x, "sy": y,
                           "sxy": x * y, "sxx": x * x, "syy": y * y})
        m = df.groupby("user_id", as_index=False).sum()
        dn = m["n"].to_numpy(np.int64)
        sx, sy = m["sx"].to_numpy(np.int64), m["sy"].to_numpy(np.int64)
        sxy = m["sxy"].to_numpy(np.int64)
        sxx, syy = m["sxx"].to_numpy(np.int64), m["syy"].to_numpy(np.int64)
        va = dn * sxx - sx * sx
        vb = dn * syy - sy * sy
        keep = (va > 0) & (vb > 0)
        fn = dn.astype(np.float64)
        fsx, fsy = sx.astype(np.float64), sy.astype(np.float64)
        num = fn * sxy.astype(np.float64) - fsx * fsy
        with np.errstate(invalid="ignore", divide="ignore"):
            ac1 = np.floor(
                num / (np.sqrt(fn * sxx.astype(np.float64) - fsx * fsx)
                       * np.sqrt(fn * syy.astype(np.float64)
                                 - fsy * fsy)) * 1000.0)
        return pd.DataFrame({"user_id": m["user_id"].to_numpy(np.int64),
                             "n_pairs": dn,
                             "ac1_milli": np.where(keep, ac1, 0)
                             .astype(np.int64)})[keep]

    out = (ds.map_batches(derive, batch_format="pyarrow")
           .groupby("bucket").map_groups(fold, batch_format="pandas")
           .to_pandas())
    return (out.sort_values("user_id", kind="mergesort")
            .reset_index(drop=True)
            .astype({c: "int64" for c in out.columns}))


_FK_EDGES = [
    ("lineitem.l_orderkey->orders.o_orderkey",
     "lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("lineitem.l_partkey->part.p_partkey",
     "lineitem", "l_partkey", "part", "p_partkey"),
    ("lineitem.l_suppkey->supplier.s_suppkey",
     "lineitem", "l_suppkey", "supplier", "s_suppkey"),
    ("orders.o_custkey->customer.c_custkey",
     "orders", "o_custkey", "customer", "c_custkey"),
    ("customer.c_nationkey->nation.n_nationkey",
     "customer", "c_nationkey", "nation", "n_nationkey"),
    ("supplier.s_nationkey->nation.n_nationkey",
     "supplier", "s_nationkey", "nation", "n_nationkey"),
    ("nation.n_regionkey->region.r_regionkey",
     "nation", "n_regionkey", "region", "r_regionkey"),
]


def fk_orphan_audit(sf_dir: str) -> pd.DataFrame:
    """Referential-integrity audit across every foreign-key edge of the
    schema: per edge, the number of child rows whose key has no parent
    (the ingestion / replication health check run before anything
    joins). Per edge: parent keys fold from per-block ``np.unique``
    partials (the concatenated partials are |keys|×|blocks| ints, then
    one driver unique — key-cardinality-sized and broadcastable for
    every parent here; a fact-sized parent would swap in the Bloom
    prefilter ``big_order_lines_bloom`` already implements), broadcast
    ONCE via ``ray.put``; the child column then streams through a
    vectorized searchsorted membership probe emitting one int per
    block — ZERO shuffle, |edges| output rows."""
    import ray

    rows = []
    for name, child, ck, parent, pk in _FK_EDGES:
        pds = ray.data.read_parquet(f"{sf_dir}/{parent}.parquet",
                                    columns=[pk])

        def puniq(t: pa.Table, pk=pk) -> pa.Table:
            u = np.unique(t.column(pk).to_numpy().astype(np.int64))
            return pa.table({"k": pa.array(u)})

        keys = np.unique(
            pds.map_batches(puniq, batch_format="pyarrow")
            .to_pandas()["k"].to_numpy(np.int64))
        kref = ray.put(keys)

        def misses(t: pa.Table, ck=ck, kref=kref) -> pa.Table:
            ks = ray.get(kref)
            v = t.column(ck).to_numpy().astype(np.int64)
            pos = np.searchsorted(ks, v)
            pos = np.minimum(pos, len(ks) - 1)
            bad = int(np.count_nonzero(ks[pos] != v)) if len(ks) \
                else len(v)
            return pa.table({"n": pa.array([bad], type=pa.int64()),
                             "tot": pa.array([len(v)], type=pa.int64())})

        cds = ray.data.read_parquet(f"{sf_dir}/{child}.parquet",
                                    columns=[ck])
        agg = cds.map_batches(misses, batch_format="pyarrow").to_pandas()
        rows.append((name, int(agg["n"].sum()), int(agg["tot"].sum())))
    out = pd.DataFrame(rows, columns=["edge", "n_orphans", "n_child"])
    return (out.sort_values("edge", kind="mergesort")
            .reset_index(drop=True)
            .astype({"n_orphans": "int64", "n_child": "int64"}))


def dau_wau(sf_dir: str) -> pd.DataFrame:
    """DAU / trailing-7-day WAU / stickiness per day — the engagement
    dashboard triple. Everything reduces over DISTINCT (user, day)
    pairs (collapsed per block first, so the ONE ``groupby(user % B)``
    exchange carries at most |users|×|days| rows): in-bucket, DAU
    partials are a day bincount of the deduped pairs, and WAU partials
    come from each user's 7-day coverage WINDOWS — merge the per-user
    intervals [day, day+6] (gaps-and-islands over deduped days, fully
    vectorized) and add ±1 marks to a difference array over the day
    grid, so a user counts once toward every window they touch and
    never twice. The driver folds two fixed-width day vectors;
    stickiness = DAU·1000 // WAU in exact integers (0 when WAU=0)."""
    ds = _read(sf_dir, "events", columns=["user_id", "ts"])

    def derive(t: pa.Table) -> pa.Table:
        u = t.column("user_id").to_numpy().astype(np.int64)
        day = t.column("ts").cast(pa.int64()).to_numpy() // _DAY_US
        pk = np.unique(u * (1 << 22) + day)       # day < 2^22 epoch days
        uu, dd = pk >> 22, pk & ((1 << 22) - 1)
        return pa.table({
            "user_id": pa.array(uu), "day": pa.array(dd),
            "bucket": pa.array((uu % 64).astype(np.int32))})

    eds = ds.map_batches(derive, batch_format="pyarrow").materialize()

    mm = eds.map_batches(
        lambda t: pa.table({
            "lo": pa.array([int(t.column("day").to_numpy().min())],
                           type=pa.int64()),
            "hi": pa.array([int(t.column("day").to_numpy().max())],
                           type=pa.int64())}),
        batch_format="pyarrow").to_pandas()
    day_lo, day_hi = int(mm["lo"].min()), int(mm["hi"].max())
    nd = day_hi - day_lo + 1

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        u = g["user_id"].to_numpy(np.int64)
        d = g["day"].to_numpy(np.int64)
        pk = np.unique(u * (1 << 22) + d)          # cross-block dedup
        uu, dd = pk >> 22, (pk & ((1 << 22) - 1)) - day_lo
        dau = np.bincount(dd, minlength=nd).astype(np.int64)
        # per-user merged window coverage [day, day+6] via islands
        newu = np.empty(len(uu), dtype=bool)
        newu[0] = True
        newu[1:] = uu[1:] != uu[:-1]
        gap = np.empty(len(uu), dtype=bool)
        gap[0] = True
        gap[1:] = newu[1:] | (dd[1:] - dd[:-1] > 6)
        starts = np.flatnonzero(gap)
        ends = np.append(starts[1:], len(uu)) - 1
        diff = np.zeros(nd + 8, dtype=np.int64)
        np.add.at(diff, dd[starts], 1)
        np.add.at(diff, np.minimum(dd[ends] + 7, nd), -1)
        wau = np.cumsum(diff)[:nd]
        return pd.DataFrame({"day_off": np.arange(nd, dtype=np.int64),
                             "dau": dau, "wau": wau})

    parts = (eds.groupby("bucket").map_groups(fold, batch_format="pandas")
             .to_pandas())
    agg = parts.groupby("day_off", as_index=False).sum()
    dau = agg["dau"].to_numpy(np.int64)
    wau = agg["wau"].to_numpy(np.int64)
    stick = np.where(wau > 0, dau * 1000 // np.maximum(wau, 1), 0)
    return pd.DataFrame({
        "day_id": agg["day_off"].to_numpy(np.int64) + day_lo,
        "dau": dau, "wau": wau,
        "stickiness_milli": stick.astype(np.int64)})


def user_feature_matrix(sf_dir: str) -> pd.DataFrame:
    """Operator FUSION capstone of the per-user family: one bucket
    exchange materializes the whole behavioral feature vector —
    n_events, sum_cents, entry/exit delta, interval-union activity
    (active_us, n_islands), peak 1-hour burst, median inter-event gap
    seconds, and lag-1 autocorrelation (0 when its variance gate
    fails, so every user stays present) — where running the individual
    operators would pay ~7 exchanges over the same rows. Inside the
    fold each feature reuses the already-oracled kernel verbatim
    (lexsort boundaries, cummax islands, packed-key burst searchsorted,
    grouped-median gather, integer moment sums); the SQL twin joins the
    same seven window subqueries on user_id. The fused shape is what a
    feature-store materialization job actually ships."""
    ds = _read(sf_dir, "events",
               columns=["event_id", "user_id", "ts", "value"])

    def derive(t: pa.Table) -> pa.Table:
        u = t.column("user_id").to_numpy().astype(np.int64)
        cents = np.floor(t.column("value").to_numpy() * 100) \
            .astype(np.int64)
        return pa.table({
            "user_id": pa.array(u),
            "ts_us": t.column("ts").cast(pa.int64()),
            "event_id": t.column("event_id"),
            "cents": pa.array(cents),
            "bucket": pa.array((u % 64).astype(np.int32))})

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        u = g["user_id"].to_numpy(np.int64)
        ts = g["ts_us"].to_numpy(np.int64)
        eid = g["event_id"].to_numpy(np.int64)
        c = g["cents"].to_numpy(np.int64)
        order = np.lexsort((eid, ts, u))
        u, ts, c = u[order], ts[order], c[order]
        n = len(u)
        newu = np.empty(n, dtype=bool)
        newu[0] = True
        newu[1:] = u[1:] != u[:-1]
        ustarts = np.flatnonzero(newu)
        uends = np.append(ustarts[1:], n) - 1
        uniq = u[ustarts]
        k = len(uniq)
        inv = np.cumsum(newu) - 1
        n_events = (uends - ustarts + 1).astype(np.int64)
        sum_cents = np.bincount(inv, weights=c).astype(np.int64)
        delta_cents = c[uends] - c[ustarts]
        # interval union [ts, ts + cents seconds] (user_active_seconds)
        e = ts + c * 1_000_000
        off = int(e.max()) + 1
        rm = np.maximum.accumulate(e + inv * off) - inv * off
        prev_rm = np.empty_like(rm)
        prev_rm[0] = 0
        prev_rm[1:] = rm[:-1]
        isl_start = newu | (ts > prev_rm)
        isl_last = np.empty(n, dtype=bool)
        isl_last[:-1] = isl_start[1:]
        isl_last[-1] = True
        cover = rm[isl_last] - ts[isl_start]
        iu_inv = inv[isl_start]
        active_us = np.bincount(iu_inv, weights=cover,
                                minlength=k).astype(np.int64)
        n_islands = np.bincount(iu_inv, minlength=k).astype(np.int64)
        # peak 1h burst (events_burst_max)
        pk = inv * (1 << 52) + ts
        cnt = np.searchsorted(pk, inv * (1 << 52) + ts + _HOUR_US,
                              side="right") \
            - np.searchsorted(pk, pk, side="left")
        max_burst = np.maximum.reduceat(cnt, ustarts)
        # median inter-event gap seconds (customer_order_gap_median)
        same = ~newu
        gi = np.flatnonzero(same)
        gap = (ts[gi] - ts[gi - 1]) // 1_000_000
        gu = inv[gi]
        o2 = np.lexsort((gap, gu))
        gus, gaps = gu[o2], gap[o2]
        gfirst = np.empty(len(gus), dtype=bool)
        med_gap = np.zeros(k, dtype=np.int64)
        if len(gus):
            gfirst[0] = True
            gfirst[1:] = gus[1:] != gus[:-1]
            gstarts = np.flatnonzero(gfirst)
            glens = np.diff(np.append(gstarts, len(gus)))
            med_gap[gus[gstarts]] = gaps[gstarts + (glens + 1) // 2 - 1]
        # lag-1 autocorrelation, 0 when variance gate fails
        x, y = c[gi - 1], c[gi]
        sn = np.bincount(gu, minlength=k).astype(np.int64)
        sx = np.bincount(gu, weights=x, minlength=k).astype(np.int64)
        sy = np.bincount(gu, weights=y, minlength=k).astype(np.int64)
        sxy = np.bincount(gu, weights=x * y, minlength=k).astype(np.int64)
        sxx = np.bincount(gu, weights=x * x, minlength=k).astype(np.int64)
        syy = np.bincount(gu, weights=y * y, minlength=k).astype(np.int64)
        va = sn * sxx - sx * sx
        vb = sn * syy - sy * sy
        gate = (va > 0) & (vb > 0)
        fn = sn.astype(np.float64)
        fsx, fsy = sx.astype(np.float64), sy.astype(np.float64)
        with np.errstate(invalid="ignore", divide="ignore"):
            ac1 = np.floor(
                (fn * sxy.astype(np.float64) - fsx * fsy)
                / (np.sqrt(fn * sxx.astype(np.float64) - fsx * fsx)
                   * np.sqrt(fn * syy.astype(np.float64) - fsy * fsy))
                * 1000.0)
        ac1_milli = np.where(gate, ac1, 0.0).astype(np.int64)
        return pd.DataFrame({
            "user_id": uniq, "n_events": n_events,
            "sum_cents": sum_cents, "delta_cents": delta_cents,
            "active_us": active_us, "n_islands": n_islands,
            "max_burst": max_burst.astype(np.int64),
            "median_gap_sec": med_gap, "ac1_milli": ac1_milli})

    out = (ds.map_batches(derive, batch_format="pyarrow")
           .groupby("bucket").map_groups(fold, batch_format="pandas")
           .to_pandas())
    return (out.sort_values("user_id", kind="mergesort")
            .reset_index(drop=True)
            .astype({c: "int64" for c in out.columns}))


def orders_daily_trend(sf_dir: str) -> pd.DataFrame:
    """Centered 7-day smoothing decomposition of daily order volume
    (the classic trend/residual split, kept EXACT by reporting the
    window sum and count instead of a float average: residual·7 =
    7·total − win7_sum when the window is full). The heavy input
    collapses to a day-cardinality rollup via one small Ray aggregate
    (map-side combined); the centered window sweep runs on the
    gapfilled day vector (driver-sized — days, not rows, same
    assumption as the other calendar rollups). Edge days report their
    partial window count so the consumer can normalize honestly."""
    ds = _read(sf_dir, "orders", columns=["o_orderdate", "o_totalprice"])

    def derive(t: pa.Table) -> pa.Table:
        d = t.column("o_orderdate").cast(pa.int64()).to_numpy() // _DAY_US
        cents = np.floor(t.column("o_totalprice").to_numpy() * 100) \
            .astype(np.int64)
        return pa.table({"day_id": pa.array(d), "cents": pa.array(cents),
                         "one": pa.array(np.ones(len(d), dtype=np.int64))})

    roll = (ds.map_batches(derive, batch_format="pyarrow")
            .groupby("day_id")
            .aggregate(Sum("cents", alias_name="total_cents"),
                       Sum("one", alias_name="n_orders"))
            .to_pandas().sort_values("day_id"))
    days = roll["day_id"].to_numpy(np.int64)
    lo, hi = int(days.min()), int(days.max())
    grid = np.arange(lo, hi + 1, dtype=np.int64)
    tot = np.zeros(len(grid), dtype=np.int64)
    cnt = np.zeros(len(grid), dtype=np.int64)
    tot[days - lo] = roll["total_cents"].to_numpy(np.int64)
    cnt[days - lo] = roll["n_orders"].to_numpy(np.int64)
    pre = np.concatenate(([0], np.cumsum(tot)))
    pre1 = np.concatenate(([0], np.cumsum(np.ones_like(tot))))
    i = np.arange(len(grid))
    a = np.maximum(i - 3, 0)
    b = np.minimum(i + 3, len(grid) - 1) + 1
    return pd.DataFrame({
        "day_id": grid, "total_cents": tot, "n_orders": cnt,
        "win7_cents": pre[b] - pre[a],
        "win7_days": (pre1[b] - pre1[a]).astype(np.int64)})


def order_ship_lag_hist(sf_dir: str) -> pd.DataFrame:
    """Order-to-first-shipment latency distribution per order priority
    (the fulfillment-SLA histogram): per order, whole days from
    o_orderdate to the EARLIEST lineitem shipdate, bucketed by week.
    Per-block packed-key min partials pre-collapse the lineitem side so
    the ONE ``groupby(order % B)`` co-partition join carries |orders|
    rows per side; each bucket joins vectorized and emits per-(priority,
    week-bucket) partial counts that the driver folds —
    constant-cardinality output. Orders with no lineitems are absent on
    both sides (inner join)."""
    lds = _read(sf_dir, "lineitem", columns=["l_orderkey", "l_shipdate"])
    ods = _read(sf_dir, "orders",
                columns=["o_orderkey", "o_orderdate", "o_orderpriority"])

    def lpart(t: pa.Table) -> pa.Table:
        ok = t.column("l_orderkey").to_numpy().astype(np.int64)
        sd = t.column("l_shipdate").cast(pa.int64()).to_numpy()
        u, inv = np.unique(ok, return_inverse=True)
        mn = np.full(len(u), np.iinfo(np.int64).max, dtype=np.int64)
        np.minimum.at(mn, inv, sd)
        return pa.table({"k": pa.array(u), "ship_us": pa.array(mn),
                         "side": pa.array(np.zeros(len(u),
                                                   dtype=np.int8)),
                         "o_us": pa.array(np.zeros(len(u),
                                                   dtype=np.int64)),
                         "prio": pa.array([""] * len(u)),
                         "bucket": pa.array((u % 64).astype(np.int32))})

    def opart(t: pa.Table) -> pa.Table:
        ok = t.column("o_orderkey").to_numpy().astype(np.int64)
        return pa.table({"k": pa.array(ok),
                         "ship_us": pa.array(np.zeros(len(ok),
                                                      dtype=np.int64)),
                         "side": pa.array(np.ones(len(ok),
                                                  dtype=np.int8)),
                         "o_us": t.column("o_orderdate").cast(pa.int64()),
                         "prio": t.column("o_orderpriority"),
                         "bucket": pa.array((ok % 64).astype(np.int32))})

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        lhs = g[g["side"] == 0]
        l2 = lhs.groupby("k")["ship_us"].min()
        rhs = g[g["side"] == 1].set_index("k")
        both = rhs.join(l2, how="inner", lsuffix="_o")
        lag_days = (both["ship_us"].to_numpy(np.int64)
                    - both["o_us"].to_numpy(np.int64)) // _DAY_US
        wk = np.maximum(lag_days, 0) // 7
        df = pd.DataFrame({"o_orderpriority": both["prio"].to_numpy(),
                           "lag_week": wk})
        out = df.groupby(["o_orderpriority", "lag_week"],
                         as_index=False).size()
        return out.rename(columns={"size": "n_orders"})

    joined = (lds.map_batches(lpart, batch_format="pyarrow")
              .union(ods.map_batches(opart, batch_format="pyarrow"))
              .groupby("bucket")
              .map_groups(fold, batch_format="pandas")
              .to_pandas())
    out = joined.groupby(["o_orderpriority", "lag_week"],
                         as_index=False)["n_orders"].sum()
    return (out.sort_values(["o_orderpriority", "lag_week"],
                            kind="mergesort")
            .reset_index(drop=True)
            .astype({"lag_week": "int64", "n_orders": "int64"}))


def lineitem_benford(sf_dir: str) -> pd.DataFrame:
    """Benford first-digit audit of line revenues (the fraud /
    synthetic-data smoke test): distribution of the leading digit of
    the discounted revenue cents. The leading digit is extracted in
    PURE integer arithmetic (repeated //10 until one digit — at most 18
    halvings of magnitude, each a vectorized whole-array op; no log10
    float edge cases at powers of ten); per-block 9-cell partials fold
    through one tiny aggregate. Zero-cent rows are excluded on both
    sides (no leading digit)."""
    ds = _read(sf_dir, "lineitem",
               columns=["l_extendedprice", "l_discount"])

    def partial(t: pa.Table) -> pa.Table:
        rev = np.floor(t.column("l_extendedprice").to_numpy()
                       * (1 - t.column("l_discount").to_numpy())
                       * 100).astype(np.int64)
        d = rev[rev > 0]
        while True:
            big = d >= 10
            if not big.any():
                break
            d = np.where(big, d // 10, d)
        cnt = np.bincount(d, minlength=10)[1:].astype(np.int64)
        return pa.table({"digit": pa.array(np.arange(1, 10,
                                                     dtype=np.int64)),
                         "n": pa.array(cnt)})

    agg = (ds.map_batches(partial, batch_format="pyarrow")
           .groupby("digit").aggregate(Sum("n", alias_name="n"))
           .to_pandas())
    out = agg[agg["n"] > 0]
    return (out.sort_values("digit", kind="mergesort")
            .reset_index(drop=True)
            .astype({"digit": "int64", "n": "int64"}))


def customer_revenue_inequality(sf_dir: str) -> pd.DataFrame:
    """Revenue-concentration metrics over the customer base: the exact
    Gini coefficient (the i-weighted closed form over ascending
    revenues, G = (2Σi·xᵢ − (n+1)Σx)/(nΣx)) and the top-decile share —
    both in EXACT arbitrary-precision integer arithmetic (1e-6 / basis
    points), mirrored by HUGEINT window math in the SQL twin. The fact
    table collapses to a customer-cardinality rollup via per-block
    packed-key partials + one bucketed reduce; the ranked sweep runs on
    the ROLLUP (driver-sized, the same documented assumption as
    ``part_abc``), tie-broken by (revenue, custkey) so the decile
    boundary is deterministic on both sides. Output: ONE row."""
    ds = _read(sf_dir, "orders", columns=["o_custkey", "o_totalprice"])

    def partial(t: pa.Table) -> pa.Table:
        ck = t.column("o_custkey").to_numpy().astype(np.int64)
        cents = np.floor(t.column("o_totalprice").to_numpy() * 100) \
            .astype(np.int64)
        u, inv = np.unique(ck, return_inverse=True)
        s = np.bincount(inv, weights=cents).astype(np.int64)
        return pa.table({"o_custkey": pa.array(u), "rev": pa.array(s),
                         "bucket": pa.array((u % 64).astype(np.int32))})

    def reduce_bucket(g: pd.DataFrame) -> pa.Table:
        out = g.groupby("o_custkey", as_index=False)["rev"].sum()
        return pa.Table.from_pandas(out, preserve_index=False)

    roll = (ds.map_batches(partial, batch_format="pyarrow")
            .groupby("bucket").map_groups(reduce_bucket,
                                          batch_format="pandas")
            .to_pandas())
    ck = roll["o_custkey"].to_numpy(np.int64)
    rev = roll["rev"].to_numpy(np.int64)
    order = np.lexsort((ck, rev))                 # ascending (rev, key)
    x = rev[order]
    n = len(x)
    tot = int(x.sum())
    srx = sum(int(i + 1) * int(v) for i, v in enumerate(x))  # exact ints
    gini_e6 = (2 * srx - (n + 1) * tot) * 1000000 // (n * tot)
    k10 = (n + 9) // 10
    top_share_bps = int(x[n - k10:].sum()) * 10000 // tot
    return pd.DataFrame({
        "n_customers": pd.array([n], dtype="int64"),
        "total_cents": pd.array([tot], dtype="int64"),
        "gini_e6": pd.array([gini_e6], dtype="int64"),
        "top10_share_bps": pd.array([top_share_bps], dtype="int64")})


def orders_priority_drift(sf_dir: str) -> pd.DataFrame:
    """Distribution-drift monitor: per month, the chi-square distance
    of that month's order-priority mix against the GLOBAL mix —
    month m's statistic is Σ_p (N·O_mp − N_m·C_p)² / (N·N_m·C_p),
    reported as the sum of per-cell micro contributions, each floored
    in EXACT arbitrary-precision integers (HUGEINT in the twin; the
    metric is defined as the sum of floored cells so both sides stay
    bit-equal — no float summation anywhere). Contingency counts come
    from per-block (month, priority) partials folded on the driver
    (cell-count-sized, zero Ray shuffle)."""
    ds = _read(sf_dir, "orders",
               columns=["o_orderdate", "o_orderpriority"])

    def partial(t: pa.Table) -> pa.Table:
        d = t.column("o_orderdate").cast(pa.int64()).to_numpy()
        month = d // _DAY_US // 30
        df = pd.DataFrame({"month_id": month,
                           "prio": t.column("o_orderpriority")
                           .to_pylist()})
        g = df.groupby(["month_id", "prio"], as_index=False).size()
        return pa.Table.from_pandas(
            g.rename(columns={"size": "n"}), preserve_index=False)

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    obs = parts.groupby(["month_id", "prio"], as_index=False)["n"].sum()
    nm = obs.groupby("month_id")["n"].sum()
    cp = obs.groupby("prio")["n"].sum()
    big_n = int(obs["n"].sum())
    acc: dict = {}
    for m, p, o in obs.itertuples(index=False):    # |cells| rows only
        num = big_n * int(o) - int(nm[m]) * int(cp[p])
        den = big_n * int(nm[m]) * int(cp[p])
        acc[m] = acc.get(m, 0) + (num * num * 1000000) // den
    out = pd.DataFrame(
        {"month_id": list(acc.keys()),
         "chi2_micro": list(acc.values()),
         "n_orders": [int(nm[m]) for m in acc]})
    return (out.sort_values("month_id", kind="mergesort")
            .reset_index(drop=True)
            .astype({c: "int64" for c in out.columns}))


def supplier_hhi(sf_dir: str) -> pd.DataFrame:
    """Herfindahl–Hirschman market-concentration index per nation over
    supplier account balances scaled to cents (the market-structure
    screen): HHI·1e8 = (Σᵢ balᵢ²)·1e8 // (Σᵢ balᵢ)² in EXACT
    arbitrary-precision integers (HUGEINT twin). Suppliers collapse to
    a per-(nation, supplier) rollup first; negative balances clamp to
    zero on both sides (shares must be non-negative). Output is
    |nations| rows from a driver fold of per-block partials — zero Ray
    shuffle."""
    ds = _read(sf_dir, "supplier", columns=["s_nationkey", "s_acctbal"])

    def partial(t: pa.Table) -> pa.Table:
        nk = t.column("s_nationkey").to_numpy().astype(np.int64)
        bal = np.maximum(
            np.floor(t.column("s_acctbal").to_numpy() * 100), 0) \
            .astype(np.int64)
        df = pd.DataFrame({"nation": nk, "s": bal, "sq": bal * bal})
        g = df.groupby("nation", as_index=False).sum()
        g["n"] = df.groupby("nation").size().to_numpy()
        return pa.Table.from_pandas(g, preserve_index=False)

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    agg = parts.groupby("nation", as_index=False).sum()
    hhi = [(int(sq) * 100000000) // (int(s) * int(s)) if s > 0 else 0
           for s, sq in zip(agg["s"], agg["sq"])]
    out = pd.DataFrame({"nation": agg["nation"].astype("int64"),
                        "n_suppliers": agg["n"].astype("int64"),
                        "hhi_e8": pd.array(hhi, dtype="int64")})
    return (out.sort_values("nation", kind="mergesort")
            .reset_index(drop=True))


def click_to_purchase_latency(sf_dir: str) -> pd.DataFrame:
    """Funnel latency: per user, whole seconds from the FIRST click to
    the first purchase AT OR AFTER it (the conversion-time metric
    behind funnel health). ONE ``groupby(user % B)`` exchange; inside
    the bucket both "first"s resolve from one lexsort — first click =
    segment head of the click subset, first purchase ≥ that ts via a
    packed-key searchsorted over the purchase subset (user in the high
    bits, so probes never cross users). Users without a click, or
    without a purchase at/after their first click, are absent on both
    sides."""
    ds = _read(sf_dir, "events",
               columns=["event_id", "user_id", "ts", "event_type"])

    def derive(t: pa.Table) -> pa.Table:
        et = t.column("event_type").to_numpy(zero_copy_only=False)
        keep = (et == "click") | (et == "purchase")
        u = t.column("user_id").to_numpy().astype(np.int64)[keep]
        ts = t.column("ts").cast(pa.int64()).to_numpy()[keep]
        return pa.table({
            "user_id": pa.array(u),
            "ts_us": pa.array(ts),
            "is_click": pa.array(et[keep] == "click"),
            "bucket": pa.array((u % 64).astype(np.int32))})

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        u = g["user_id"].to_numpy(np.int64)
        ts = g["ts_us"].to_numpy(np.int64)
        ic = g["is_click"].to_numpy(bool)
        cu, cts = u[ic], ts[ic]
        order = np.lexsort((cts, cu))
        cu, cts = cu[order], cts[order]
        firstc = np.empty(len(cu), dtype=bool)
        if not len(cu):
            return pd.DataFrame({"user_id": pd.array([], dtype="int64"),
                                 "latency_sec": pd.array([],
                                                         dtype="int64")})
        firstc[0] = True
        firstc[1:] = cu[1:] != cu[:-1]
        fu, fts = cu[firstc], cts[firstc]          # first click per user
        pu, pts = u[~ic], ts[~ic]
        if not len(pu):
            return pd.DataFrame({"user_id": pd.array([], dtype="int64"),
                                 "latency_sec": pd.array([],
                                                         dtype="int64")})
        po = np.lexsort((pts, pu))
        pk = pu[po] * (1 << 52) + pts[po]
        idx = np.searchsorted(pk, fu * (1 << 52) + fts, side="left")
        valid = idx < len(pk)
        safe = np.minimum(idx, len(pk) - 1)
        valid &= (pk[safe] >> 52) == fu
        lat = (pk[safe] - (fu * (1 << 52))) - fts
        return pd.DataFrame({"user_id": fu[valid],
                             "latency_sec": lat[valid] // 1_000_000})

    out = (ds.map_batches(derive, batch_format="pyarrow")
           .groupby("bucket").map_groups(fold, batch_format="pandas")
           .to_pandas())
    return (out.sort_values("user_id", kind="mergesort")
            .reset_index(drop=True)
            .astype({"user_id": "int64", "latency_sec": "int64"}))


def event_type_overlap(sf_dir: str) -> pd.DataFrame:
    """User-level co-occurrence matrix of event types: for each ordered
    type pair (a ≤ b), how many users performed BOTH — the audience
    overlap table behind segment sizing. Each block collapses to
    distinct (user, type) pairs; ONE ``groupby(user % B)`` exchange
    folds each user's types into a ≤2^|types| BITMASK, and each bucket
    emits mask counts (constant cardinality) that the driver expands
    into pair counts by popcount combinatorics — the quadratic step
    runs over 2^|types| masks, never over users."""
    ds = _read(sf_dir, "events", columns=["user_id", "event_type"])

    def derive(t: pa.Table) -> pa.Table:
        u = t.column("user_id").to_numpy().astype(np.int64)
        et = t.column("event_type").to_numpy(zero_copy_only=False)
        df = pd.DataFrame({"user_id": u, "event_type": et}) \
            .drop_duplicates()
        uu = df["user_id"].to_numpy(np.int64)
        return pa.table({
            "user_id": pa.array(uu),
            "event_type": pa.array(df["event_type"].to_numpy()),
            "bucket": pa.array((uu % 64).astype(np.int32))})

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        types, codes = np.unique(g["event_type"].to_numpy(),
                                 return_inverse=True)
        u = g["user_id"].to_numpy(np.int64)
        uniq, inv = np.unique(u, return_inverse=True)
        masks = np.zeros(len(uniq), dtype=np.int64)
        np.bitwise_or.at(masks, inv, np.int64(1) << codes)
        mv, mc = np.unique(masks, return_counts=True)
        rows = []
        for m, cnt in zip(mv, mc):                # ≤2^|types| masks
            present = [i for i in range(len(types)) if m >> i & 1]
            for i in present:
                for j in present:
                    if types[i] <= types[j]:
                        rows.append((types[i], types[j], int(cnt)))
        return pd.DataFrame(rows, columns=["type_a", "type_b",
                                           "n_users"])

    parts = (ds.map_batches(derive, batch_format="pyarrow")
             .groupby("bucket").map_groups(fold, batch_format="pandas")
             .to_pandas())
    out = parts.groupby(["type_a", "type_b"], as_index=False)["n_users"] \
        .sum()
    return (out.sort_values(["type_a", "type_b"], kind="mergesort")
            .reset_index(drop=True).astype({"n_users": "int64"}))


def events_daily_acf(sf_dir: str, max_lag: int = 7) -> pd.DataFrame:
    """Autocorrelation function of the DAILY volume series at lags
    1..max_lag (the periodicity detector: a weekly cycle shows as a
    lag-7 peak): Pearson correlation of (T_d, T_{d+L}) pairs over the
    gapfilled day grid, from exact integer moments with the SAME IEEE
    closed-form order as the SQL twin. The heavy input collapses to
    the day-cardinality rollup via one small Ray aggregate; the lag
    sweep runs on the day VECTOR (driver-sized — the calendar, not the
    rows). Lags whose pair variance is zero report 0 via the integer
    gate."""
    ds = _read(sf_dir, "events", columns=["ts", "value"])

    def derive(t: pa.Table) -> pa.Table:
        d = t.column("ts").cast(pa.int64()).to_numpy() // _DAY_US
        cents = np.floor(t.column("value").to_numpy() * 100) \
            .astype(np.int64)
        return pa.table({"day_id": pa.array(d), "cents": pa.array(cents)})

    roll = (ds.map_batches(derive, batch_format="pyarrow")
            .groupby("day_id").aggregate(Sum("cents", alias_name="tot"))
            .to_pandas().sort_values("day_id"))
    days = roll["day_id"].to_numpy(np.int64)
    lo, hi = int(days.min()), int(days.max())
    tvec = np.zeros(hi - lo + 1, dtype=np.int64)
    tvec[days - lo] = roll["tot"].to_numpy(np.int64)
    rows = []
    for lag in range(1, max_lag + 1):
        x = tvec[:-lag]
        y = tvec[lag:]
        n = len(x)
        sx, sy = int(x.sum()), int(y.sum())
        sxy = int((x * y).sum())
        sxx, syy = int((x * x).sum()), int((y * y).sum())
        va, vb = n * sxx - sx * sx, n * syy - sy * sy
        if va > 0 and vb > 0:
            num = float(n) * float(sxy) - float(sx) * float(sy)
            den = np.sqrt(float(n) * float(sxx) - float(sx) * float(sx)) \
                * np.sqrt(float(n) * float(syy) - float(sy) * float(sy))
            acf = int(np.floor(num / den * 1000.0))
        else:
            acf = 0
        rows.append((lag, n, acf))
    return pd.DataFrame(rows, columns=["lag", "n_pairs", "acf_milli"]) \
        .astype({"lag": "int64", "n_pairs": "int64",
                 "acf_milli": "int64"})


def event_transition_probs(sf_dir: str) -> pd.DataFrame:
    """Row-stochastic Markov transition matrix in exact basis points:
    P(next=to | prev=from) = (n_pair·10000) // n_from_total — the
    normalized form of ``event_transitions`` that a sequence model
    actually consumes. Same single exchange as the count op (the fold
    output is transition-matrix-sized); normalization happens on the
    matrix, in integer division (HUGEINT-free: counts fit easily)."""
    counts = event_transitions(sf_dir)
    row_tot = counts.groupby("from_type")["n"].transform("sum")
    out = counts.assign(
        p_bps=(counts["n"] * 10000 // row_tot).astype("int64"))
    return (out.sort_values(["from_type", "to_type"], kind="mergesort")
            .reset_index(drop=True)
            .astype({"n": "int64", "p_bps": "int64"}))


def events_systematic_sample(sf_dir: str, k: int = 97) -> pd.DataFrame:
    """Deterministic systematic sampling: keep exactly the rows whose
    0-based GLOBAL rank under the total order (value-cents, event_id)
    is divisible by k — the reproducible every-k-th audit sample that,
    unlike hash sampling, is perfectly stratified along the sort key.
    Reuses the exact-global-rank machinery of ``events_ntile``
    verbatim: one broadcast distinct-value CDF + one intra-tie bucket
    exchange — no global sort."""
    ds = _read(sf_dir, "events", columns=["event_id", "value"])

    def vc_partial(t: pa.Table) -> pa.Table:
        v = np.floor(t.column("value").to_numpy() * 100).astype(np.int64)
        u, c = np.unique(v, return_counts=True)
        return pa.table({"cents": pa.array(u),
                         "n": pa.array(c.astype(np.int64)),
                         "vbucket": pa.array((u % 64).astype(np.int32))})

    def vc_reduce(g: pd.DataFrame) -> pa.Table:
        out = g.groupby("cents", as_index=False)["n"].sum()
        return pa.Table.from_pandas(out, preserve_index=False)

    vc = (ds.map_batches(vc_partial, batch_format="pyarrow")
          .groupby("vbucket").map_groups(vc_reduce, batch_format="pandas")
          .to_pandas().sort_values("cents", kind="mergesort"))
    vals = vc["cents"].to_numpy(np.int64)
    cum = np.concatenate(([0], np.cumsum(vc["n"].to_numpy(np.int64))))
    import ray
    vals_ref = ray.put(vals)
    cum_ref = ray.put(cum[:-1])

    def derive(t: pa.Table) -> pa.Table:
        v = np.floor(t.column("value").to_numpy() * 100).astype(np.int64)
        return pa.table({"event_id": t.column("event_id"),
                         "cents": pa.array(v),
                         "bucket": pa.array((v % 64).astype(np.int32))})

    def pick(g: pd.DataFrame) -> pd.DataFrame:
        va = ray.get(vals_ref)
        cu = ray.get(cum_ref)
        c = g["cents"].to_numpy(np.int64)
        eid = g["event_id"].to_numpy(np.int64)
        order = np.lexsort((eid, c))
        cs, es = c[order], eid[order]
        seg = np.empty(len(cs), dtype=bool)
        if len(cs):
            seg[0] = True
            seg[1:] = cs[1:] != cs[:-1]
        idx = np.arange(len(cs))
        seg_start = np.maximum.accumulate(np.where(seg, idx, -1))
        r = cu[np.searchsorted(va, cs)] + (idx - seg_start)
        keep = (r % k) == 0
        return pd.DataFrame({"event_id": es[keep],
                             "cents": cs[keep],
                             "global_rank": r[keep]})

    out = (ds.map_batches(derive, batch_format="pyarrow")
           .groupby("bucket").map_groups(pick, batch_format="pandas")
           .to_pandas())
    return (out.sort_values("global_rank", kind="mergesort")
            .reset_index(drop=True)
            .astype({c: "int64" for c in out.columns}))


def user_value_cusum(sf_dir: str, k_cents: int = 2500,
                     h_cents: int = 50000) -> pd.DataFrame:
    """CUSUM change-point detector per user — the textbook SEQUENTIAL
    recurrence s_i = max(0, s_{i-1} + (x_i − k)) made data-parallel via
    its prefix-scan closed form s_i = p_i − min(0, min_{j≤i} p_j) with
    p the running sum of (x − k): one cumsum and one segment-reset
    running min replace the loop, all in exact integers. ONE
    ``groupby(user % B)`` exchange; the SQL twin is two stacked
    UNBOUNDED-PRECEDING windows. Output: every event's cusum level and
    the alarm flag (level > h)."""
    ds = _read(sf_dir, "events",
               columns=["event_id", "user_id", "ts", "value"])

    def derive(t: pa.Table) -> pa.Table:
        u = t.column("user_id").to_numpy().astype(np.int64)
        cents = np.floor(t.column("value").to_numpy() * 100) \
            .astype(np.int64)
        return pa.table({
            "user_id": pa.array(u),
            "ts_us": t.column("ts").cast(pa.int64()),
            "event_id": t.column("event_id"),
            "cents": pa.array(cents),
            "bucket": pa.array((u % 64).astype(np.int32))})

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        u = g["user_id"].to_numpy(np.int64)
        ts = g["ts_us"].to_numpy(np.int64)
        eid = g["event_id"].to_numpy(np.int64)
        c = g["cents"].to_numpy(np.int64)
        order = np.lexsort((eid, ts, u))
        us, cs, es = u[order], c[order], eid[order]
        newu = np.empty(len(us), dtype=bool)
        newu[0] = True
        newu[1:] = us[1:] != us[:-1]
        seg = np.cumsum(newu) - 1
        d = cs - k_cents
        p = np.cumsum(d)
        idx = np.arange(len(p))
        start_at = np.maximum.accumulate(np.where(newu, idx, -1))
        p = p - (p - d)[start_at]                  # per-user running sum
        # segment-reset running min: earlier segments can never win the
        # min once each segment is shifted down by seg·BIG
        big = int(p.max()) - int(p.min()) + 1 if len(p) else 1
        cmin = np.minimum.accumulate(p - seg * big) + seg * big
        s = p - np.minimum(cmin, 0)
        return pd.DataFrame({"event_id": es, "cusum_cents": s,
                             "alarm": (s > h_cents).astype(np.int64)})

    out = (ds.map_batches(derive, batch_format="pyarrow")
           .groupby("bucket").map_groups(fold, batch_format="pandas")
           .to_pandas())
    return (out.sort_values("event_id", kind="mergesort")
            .reset_index(drop=True)
            .astype({c: "int64" for c in out.columns}))


def user_streak_max(sf_dir: str) -> pd.DataFrame:
    """Longest consecutive-active-day streak per user (the engagement
    "streak" badge — classic gaps-and-islands over DISTINCT days).
    Ray shape mirrors dau_wau: dedupe (user, day) packed int64 pairs
    per block so the ONE ``groupby(user % 64)`` exchange moves at most
    |users|×|days| rows, then a fully vectorized bucket fold —
    np.unique on the packed key re-dedupes across blocks AND delivers
    (user, day) pre-sorted, consecutive runs are the segments where
    the day delta is exactly 1 within one user, and the per-user max
    run comes from one ``np.maximum.reduceat``. No per-user loop, no
    global sort. SQL twin: the textbook day − ROW_NUMBER() island key."""
    ds = _read(sf_dir, "events", columns=["user_id", "ts"])

    def derive(t: pa.Table) -> pa.Table:
        u = t.column("user_id").to_numpy().astype(np.int64)
        day = t.column("ts").cast(pa.int64()).to_numpy() // _DAY_US
        pk = np.unique(u * (1 << 22) + day)       # day < 2^22 epoch days
        uu = pk >> 22
        return pa.table({
            "pk": pa.array(pk),
            "bucket": pa.array((uu % 64).astype(np.int32))})

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        pk = np.unique(g["pk"].to_numpy(np.int64))  # cross-block dedup
        uu, dd = pk >> 22, pk & ((1 << 22) - 1)
        run_start = np.empty(len(pk), dtype=bool)
        run_start[0] = True
        # a new run wherever the user changes or the day gap is not 1
        # (packed-key delta of 1 == same user, consecutive day)
        run_start[1:] = pk[1:] - pk[:-1] != 1
        starts = np.flatnonzero(run_start)
        run_len = np.append(starts[1:], len(pk)) - starts
        newu = np.empty(len(starts), dtype=bool)
        newu[0] = True
        newu[1:] = uu[starts][1:] != uu[starts][:-1]
        ustarts = np.flatnonzero(newu)
        return pd.DataFrame({
            "user_id": uu[starts][ustarts],
            "n_days": np.add.reduceat(run_len, ustarts).astype(np.int64),
            "max_streak": np.maximum.reduceat(run_len, ustarts)
            .astype(np.int64)})

    out = (ds.map_batches(derive, batch_format="pyarrow")
           .groupby("bucket").map_groups(fold, batch_format="pandas")
           .to_pandas())
    return (out.sort_values("user_id", kind="mergesort")
            .reset_index(drop=True)
            .astype({"user_id": "int64", "n_days": "int64",
                     "max_streak": "int64"}))


def lineitem_weighted_median(sf_dir: str) -> pd.DataFrame:
    """Quantity-weighted median price per return flag — the robust
    "typical unit price" statistic (lower weighted median: the smallest
    price whose cumulative weight reaches half the total, discrete and
    tie-exact in integers: first cents with 2·cumw ≥ total). Ray shape:
    per-block partials collapse (flag, cents) → Σqty on a packed int64
    key, so the ONE exchange on the 3-value flag moves |distinct
    prices| partial rows, never lines; the per-flag fold re-collapses,
    and the packed key sorts by cents for free, so the crossing is one
    searchsorted on 2·cumsum. SQL twin: windowed cumulative weight with
    MIN(cents) FILTER (WHERE 2·cw ≥ tot)."""
    ds = _read(sf_dir, "lineitem",
               columns=["l_returnflag", "l_extendedprice", "l_quantity"])
    FLAGS = 4                                      # R/A/N fit in 2 bits

    def derive(t: pa.Table) -> pa.Table:
        flag = pc.index_in(
            t.column("l_returnflag"),
            value_set=pa.array(["A", "N", "R"])).to_numpy(
                zero_copy_only=False).astype(np.int64)
        cents = np.floor(
            t.column("l_extendedprice").to_numpy() * 100).astype(np.int64)
        qty = np.floor(t.column("l_quantity").to_numpy()).astype(np.int64)
        pk = flag * (1 << 40) + cents              # cents < 2^40
        uk, inv = np.unique(pk, return_inverse=True)
        w = np.bincount(inv, weights=qty).astype(np.int64)
        return pa.table({"pk": pa.array(uk), "w": pa.array(w),
                         "flag": pa.array(uk >> 40)})

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        pk = g["pk"].to_numpy(np.int64)
        w = g["w"].to_numpy(np.int64)
        uk, inv = np.unique(pk, return_inverse=True)  # sorted by cents
        ww = np.bincount(inv, weights=w).astype(np.int64)
        cw = 2 * np.cumsum(ww)
        tot = int(cw[-1]) // 2
        at = int(np.searchsorted(cw, tot))         # first 2·cumw ≥ tot
        return pd.DataFrame({
            "flag_code": [int(uk[0] >> 40)],
            "wmedian_cents": [int(uk[at] & ((1 << 40) - 1))],
            "total_qty": [tot]})

    out = (ds.map_batches(derive, batch_format="pyarrow")
           .groupby("flag").map_groups(fold, batch_format="pandas")
           .to_pandas())
    out["l_returnflag"] = np.array(["A", "N", "R", "?"])[
        out["flag_code"].to_numpy(np.int64) % FLAGS]
    out = out[["l_returnflag", "wmedian_cents", "total_qty"]]
    return (out.sort_values("l_returnflag", kind="mergesort")
            .reset_index(drop=True)
            .astype({"wmedian_cents": "int64", "total_qty": "int64"}))


def events_ks_test(sf_dir: str) -> pd.DataFrame:
    """Two-sample Kolmogorov–Smirnov distance between the value
    distributions of 'click' and 'purchase' events — the drift /
    A-B-difference test, EXACT: the statistic is reported as the
    cross-multiplied integer numerator max|cum₁·n₂ − cum₂·n₁| (never
    a float CDF), plus its floor-milli quotient. Ray shape: zero
    shuffle — per-block (cents, side) count partials on a packed key
    (the histogram-fold idiom), driver folds |distinct cents| rows and
    one cumsum sweep per side yields both CDFs already value-sorted by
    the pack. SQL twin: windowed cumulative counts over the distinct
    grid, HUGEINT cross-products."""
    ds = _read(sf_dir, "events", columns=["event_type", "value"])

    def partial(t: pa.Table) -> pa.Table:
        et = t.column("event_type")
        keep = pc.is_in(et, value_set=pa.array(["click", "purchase"]))
        t = t.filter(keep)
        a = pc.equal(t.column("event_type"), "click").to_numpy(
            zero_copy_only=False)
        cents = np.floor(t.column("value").to_numpy() * 100) \
            .astype(np.int64)
        pk = cents * 2 + (~a).astype(np.int64)     # side in the low bit
        uk, inv = np.unique(pk, return_inverse=True)
        n = np.bincount(inv).astype(np.int64)
        return pa.table({"pk": pa.array(uk), "n": pa.array(n)})

    parts = (ds.map_batches(partial, batch_format="pyarrow")
             .to_pandas())
    agg = parts.groupby("pk", as_index=False)["n"].sum()
    pk = agg["pk"].to_numpy(np.int64)              # sorted by (cents, side)
    n = agg["n"].to_numpy(np.int64)
    v = pk >> 1
    side = pk & 1
    grid = np.unique(v)
    c1 = np.zeros(len(grid), dtype=np.int64)
    c2 = np.zeros(len(grid), dtype=np.int64)
    pos = np.searchsorted(grid, v)
    np.add.at(c1, pos[side == 0], n[side == 0])
    np.add.at(c2, pos[side == 1], n[side == 1])
    cum1 = np.cumsum(c1, dtype=np.int64)
    cum2 = np.cumsum(c2, dtype=np.int64)
    n1, n2 = int(cum1[-1]), int(cum2[-1])
    diff = np.abs(cum1 * n2 - cum2 * n1)           # < 2^62 at any sf here
    ks_num = int(diff.max())
    return pd.DataFrame({
        "n1": pd.array([n1], dtype="int64"),
        "n2": pd.array([n2], dtype="int64"),
        "ks_num": pd.array([ks_num], dtype="int64"),
        "ks_milli": pd.array([ks_num * 1000 // (n1 * n2)],
                             dtype="int64")})


def events_mwu(sf_dir: str) -> pd.DataFrame:
    """Mann–Whitney U rank-sum test (tie-exact) between 'click' and
    'purchase' value distributions, with the AUC effect size — the
    nonparametric A/B readout. Tie handling is EXACT in doubled
    integers: over the distinct-value grid, 2·U₁ = Σ c₁·(2·cum₂(<v) +
    c₂) (each tie contributes ½·c₁·c₂, never a float rank). Same
    zero-shuffle histogram-fold shape as ``events_ks_test``; the AUC
    ships as floor(U₁·1000 / (n₁·n₂)) = u1_x2·1000 // (2·n₁·n₂). SQL
    twin: exclusive-window cumulative counts, HUGEINT products."""
    ds = _read(sf_dir, "events", columns=["event_type", "value"])

    def partial(t: pa.Table) -> pa.Table:
        et = t.column("event_type")
        keep = pc.is_in(et, value_set=pa.array(["click", "purchase"]))
        t = t.filter(keep)
        a = pc.equal(t.column("event_type"), "click").to_numpy(
            zero_copy_only=False)
        cents = np.floor(t.column("value").to_numpy() * 100) \
            .astype(np.int64)
        pk = cents * 2 + (~a).astype(np.int64)
        uk, inv = np.unique(pk, return_inverse=True)
        n = np.bincount(inv).astype(np.int64)
        return pa.table({"pk": pa.array(uk), "n": pa.array(n)})

    parts = (ds.map_batches(partial, batch_format="pyarrow")
             .to_pandas())
    agg = parts.groupby("pk", as_index=False)["n"].sum()
    pk = agg["pk"].to_numpy(np.int64)
    n = agg["n"].to_numpy(np.int64)
    v = pk >> 1
    side = pk & 1
    grid = np.unique(v)
    c1 = np.zeros(len(grid), dtype=np.int64)
    c2 = np.zeros(len(grid), dtype=np.int64)
    pos = np.searchsorted(grid, v)
    np.add.at(c1, pos[side == 0], n[side == 0])
    np.add.at(c2, pos[side == 1], n[side == 1])
    cum2_less = np.concatenate(([0], np.cumsum(c2)[:-1]))
    n1, n2 = int(c1.sum()), int(c2.sum())
    u1_x2 = int((c1 * (2 * cum2_less + c2)).sum())
    return pd.DataFrame({
        "n1": pd.array([n1], dtype="int64"),
        "n2": pd.array([n2], dtype="int64"),
        "u1_x2": pd.array([u1_x2], dtype="int64"),
        "u2_x2": pd.array([2 * n1 * n2 - u1_x2], dtype="int64"),
        "auc_milli": pd.array([u1_x2 * 1000 // (2 * n1 * n2)],
                              dtype="int64")})


def key_skew_report(sf_dir: str) -> pd.DataFrame:
    """Shuffle-key skew diagnostics for events.user_id — the "pipeline
    doctor" report you run BEFORE picking a partitioning key at 100 TB:
    key cardinality, per-key count extremes, exact disc quantiles of
    the count distribution (p50/p90/p99, quantile_disc convention
    sorted[ceil(q·n)−1]), the heaviest key's share and the top-10-key
    share in basis points. Ray shape: per-block packed np.unique count
    partials, ONE bucketed reduce to exact per-key counts, and the
    ranked sweep runs on the count-of-counts rollup (key-cardinality-
    sized, same documented driver-side assumption as ``part_abc``).
    SQL twin: GROUP BY + quantile_disc + window shares."""
    ds = _read(sf_dir, "events", columns=["user_id"])

    def partial(t: pa.Table) -> pa.Table:
        u, cnt = np.unique(
            t.column("user_id").to_numpy().astype(np.int64),
            return_counts=True)
        return pa.table({
            "user_id": pa.array(u), "n": pa.array(cnt.astype(np.int64)),
            "bucket": pa.array((u % 64).astype(np.int32))})

    def reduce_bucket(g: pd.DataFrame) -> pa.Table:
        out = g.groupby("user_id", as_index=False)["n"].sum()
        return pa.Table.from_pandas(out, preserve_index=False)

    roll = (ds.map_batches(partial, batch_format="pyarrow")
            .groupby("bucket").map_groups(reduce_bucket,
                                          batch_format="pandas")
            .to_pandas())
    cnt = np.sort(roll["n"].to_numpy(np.int64))    # ascending
    k = len(cnt)
    rows = int(cnt.sum())
    p = lambda q_num, q_den: int(cnt[-(-q_num * k // q_den) - 1])
    top10 = int(cnt[max(0, k - 10):].sum())
    return pd.DataFrame({
        "n_keys": pd.array([k], dtype="int64"),
        "n_rows": pd.array([rows], dtype="int64"),
        "min_cnt": pd.array([int(cnt[0])], dtype="int64"),
        "max_cnt": pd.array([int(cnt[-1])], dtype="int64"),
        "mean_milli": pd.array([rows * 1000 // k], dtype="int64"),
        "p50_cnt": pd.array([p(1, 2)], dtype="int64"),
        "p90_cnt": pd.array([p(9, 10)], dtype="int64"),
        "p99_cnt": pd.array([p(99, 100)], dtype="int64"),
        "top1_share_bps": pd.array([int(cnt[-1]) * 10000 // rows],
                                   dtype="int64"),
        "top10_share_bps": pd.array([top10 * 10000 // rows],
                                    dtype="int64")})


def events_seasonal_backtest(sf_dir: str) -> pd.DataFrame:
    """Seasonal-naive forecast backtest: predict each day's event
    volume as the volume seven days earlier and score the horizon —
    the baseline every real forecaster must beat, and the eval-harness
    shape (point-in-time forecast vs actual, no leakage) a training
    pipeline runs on its own telemetry. Zero shuffle: per-block day
    bincount partials (the gapfilled-day-vector idiom of
    ``orders_daily_trend``) fold into ONE day-grid vector on the
    driver; the lag-7 shift and absolute errors are one vectorized
    subtraction. Scored days are those with a full 7-day history.
    SQL twin: gapfilled day spine + LAG(7) window."""
    ds = _read(sf_dir, "events", columns=["ts"])

    def partial(t: pa.Table) -> pa.Table:
        day = t.column("ts").cast(pa.int64()).to_numpy() // _DAY_US
        u, cnt = np.unique(day, return_counts=True)
        return pa.table({"day": pa.array(u),
                         "n": pa.array(cnt.astype(np.int64))})

    parts = (ds.map_batches(partial, batch_format="pyarrow")
             .to_pandas())
    agg = parts.groupby("day", as_index=False)["n"].sum()
    day_lo = int(agg["day"].min())
    nd = int(agg["day"].max()) - day_lo + 1
    vec = np.zeros(nd, dtype=np.int64)             # gapfilled: 0 on gaps
    vec[agg["day"].to_numpy(np.int64) - day_lo] = agg["n"].to_numpy(
        np.int64)
    if nd <= 7:
        return pd.DataFrame({"day_id": pd.array([], dtype="int64"),
                             "actual": pd.array([], dtype="int64"),
                             "forecast": pd.array([], dtype="int64"),
                             "abs_err": pd.array([], dtype="int64")})
    actual = vec[7:]
    forecast = vec[:-7]
    return pd.DataFrame({
        "day_id": np.arange(7, nd, dtype=np.int64) + day_lo,
        "actual": actual, "forecast": forecast,
        "abs_err": np.abs(actual - forecast)}).astype("int64")


def session_funnel_strict(sf_dir: str,
                          gap_us: int = 1_800_000_000) -> pd.DataFrame:
    """MATCH_RECOGNIZE-lite: per user, how many 30-min sessions contain
    the STRICTLY ordered subsequence click → view → purchase (each step
    at a strictly later timestamp, so the answer is independent of the
    order ties arrive in). Ray shape: one ``groupby(user % 64)``
    exchange; inside a bucket the session ids come from the same
    sort/diff/cumsum break scan as ``user_sessions``, and the
    subsequence probe is CHAINED searchsorted over packed
    (session, ts) keys — t₁ = first click per session (reduceat min),
    t₂ = first view with ts > t₁ (one searchsorted into the session's
    view rows), t₃ = first purchase with ts > t₂ — no per-session
    loop. SQL twin: window-function sessionization + two
    min-after-join steps."""
    ds = _read(sf_dir, "events", columns=["user_id", "ts", "event_type"])

    def derive(t: pa.Table) -> pa.Table:
        u = t.column("user_id").to_numpy().astype(np.int64)
        code = pc.index_in(
            t.column("event_type"),
            value_set=pa.array(["click", "view", "purchase"])) \
            .fill_null(-1).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        return pa.table({
            "user_id": pa.array(u),
            "ts_us": t.column("ts").cast(pa.int64()),
            "code": pa.array(code),
            "bucket": pa.array((u % 64).astype(np.int32))})

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        u = g["user_id"].to_numpy(np.int64)
        ts = g["ts_us"].to_numpy(np.int64)
        code = g["code"].to_numpy(np.int64)
        order = np.lexsort((ts, u))
        u, ts, code = u[order], ts[order], code[order]
        n = len(u)
        newu = np.empty(n, dtype=bool)
        newu[0] = True
        newu[1:] = u[1:] != u[:-1]
        brk = newu.copy()
        brk[1:] |= (ts[1:] - ts[:-1]) > gap_us
        sid = np.cumsum(brk) - 1                   # bucket-local id
        # packed (session, ts) probes; ts_us < 2^52
        pk = sid * (1 << 52) + ts
        sstarts = np.flatnonzero(brk)
        ns = len(sstarts)
        # t1: first click per session (+inf sentinel so min is exact)
        t1 = np.full(ns, np.iinfo(np.int64).max, dtype=np.int64)
        clk = code == 0
        np.minimum.at(t1, sid[clk], ts[clk])
        have1 = t1 < np.iinfo(np.int64).max

        def first_after(code_val: int, tprev: np.ndarray,
                        have: np.ndarray) -> tuple:
            m = code == code_val
            pkm = pk[m]
            sidm = sid[m]
            t = np.full(ns, np.iinfo(np.int64).max, dtype=np.int64)
            if len(pkm) == 0:
                return t, np.zeros(ns, dtype=bool)
            ends = np.searchsorted(sidm, np.arange(ns), side="right")
            probe = np.searchsorted(
                pkm, np.arange(ns, dtype=np.int64) * (1 << 52)
                + np.minimum(tprev, (1 << 52) - 1), side="right")
            ok = have & (probe < ends)
            t[ok] = pkm[np.minimum(probe, len(pkm) - 1)][ok] \
                & ((1 << 52) - 1)
            return t, ok

        t2, have2 = first_after(1, t1, have1)
        t3, have3 = first_after(2, t2, have2)
        # per-user rollup: sessions are contiguous in user order
        user_of_sid = u[sstarts]
        nu = np.empty(ns, dtype=bool)
        nu[0] = True
        nu[1:] = user_of_sid[1:] != user_of_sid[:-1]
        ust = np.flatnonzero(nu)
        return pd.DataFrame({
            "user_id": user_of_sid[ust],
            "n_sessions": np.add.reduceat(
                np.ones(ns, dtype=np.int64), ust),
            "n_funnel_sessions": np.add.reduceat(
                have3.astype(np.int64), ust)})

    out = (ds.map_batches(derive, batch_format="pyarrow")
           .groupby("bucket").map_groups(fold, batch_format="pandas")
           .to_pandas())
    return (out.sort_values("user_id", kind="mergesort")
            .reset_index(drop=True)
            .astype({"user_id": "int64", "n_sessions": "int64",
                     "n_funnel_sessions": "int64"}))


def lineitem_cube(sf_dir: str) -> pd.DataFrame:
    """CUBE grouping-sets rollup over (returnflag, linestatus,
    ship_year): all 8 subtotal levels in one pass — the OLAP shape BI
    layers push at a fact table. Zero shuffle: the finest-grain key has
    ~42 distinct cells, so per-block partials fold on the driver and
    every coarser grouping set is derived from the finest cells by
    re-aggregation (constant work) — a Ray CUBE would shuffle the whole
    fact table eight times for 100-odd output rows. Rolled-up
    dimensions render as the literal ``'ALL'`` (the key columns are
    non-null in this schema). SQL twin: GROUP BY CUBE + COALESCE."""
    ds = _read(sf_dir, "lineitem",
               columns=["l_returnflag", "l_linestatus", "l_shipdate",
                        "l_quantity", "l_extendedprice", "l_discount"])

    def partial(t: pa.Table) -> pa.Table:
        price = t.column("l_extendedprice").to_numpy()
        disc = t.column("l_discount").to_numpy()
        yr = (t.column("l_shipdate").to_numpy()
              .astype("datetime64[Y]").astype(np.int64) + 1970)
        df = pd.DataFrame({
            "l_returnflag": t.column("l_returnflag").to_pandas(),
            "l_linestatus": t.column("l_linestatus").to_pandas(),
            "ship_year": yr.astype(str),
            "qty": t.column("l_quantity").to_numpy().astype(np.int64),
            "rev": np.floor(price * (1 - disc) * 100).astype(np.int64)})
        out = (df.groupby(["l_returnflag", "l_linestatus", "ship_year"],
                          as_index=False)
               .agg(n_rows=("qty", "size"), sum_qty=("qty", "sum"),
                    revenue_cents=("rev", "sum")))
        return pa.Table.from_pandas(out, preserve_index=False)

    cells = (ds.map_batches(partial, batch_format="pyarrow").to_pandas()
             .groupby(["l_returnflag", "l_linestatus", "ship_year"],
                      as_index=False)
             .agg(n_rows=("n_rows", "sum"), sum_qty=("sum_qty", "sum"),
                  revenue_cents=("revenue_cents", "sum")))
    dims = ["l_returnflag", "l_linestatus", "ship_year"]
    frames = []
    for mask in range(8):                       # all grouping sets
        keep = [d for i, d in enumerate(dims) if mask & (1 << i)]
        g = (cells.groupby(keep, as_index=False)[
                 ["n_rows", "sum_qty", "revenue_cents"]].sum()
             if keep else
             cells[["n_rows", "sum_qty", "revenue_cents"]].sum()
             .to_frame().T)
        for d in dims:
            if d not in keep:
                g[d] = "ALL"
        frames.append(g[dims + ["n_rows", "sum_qty", "revenue_cents"]])
    out = pd.concat(frames, ignore_index=True)
    return (out.sort_values(dims, kind="mergesort")
            .reset_index(drop=True)
            .astype({"n_rows": "int64", "sum_qty": "int64",
                     "revenue_cents": "int64"}))


def user_ab_test(sf_dir: str) -> pd.DataFrame:
    """A/B experiment harness: users split by ``user_id % 2``,
    conversion = "has at least one purchase event", scored as the exact
    2×2 chi-square statistic χ²·1e6 = N·(ad−bc)²·10⁶ // (row·col
    products) in arbitrary-precision integers (HUGEINT twin) — the
    leakage-free eval readout an experimentation platform computes
    per metric. Shape: per-block (user, any-purchase) partials collapse
    each block to ≤1 row per user, one ``user % 64`` bucket exchange
    folds them exactly, and each bucket ships only four counters."""
    ds = _read(sf_dir, "events", columns=["user_id", "event_type"])

    def partial(t: pa.Table) -> pa.Table:
        u = t.column("user_id").to_numpy().astype(np.int64)
        conv = pc.equal(t.column("event_type"),
                        "purchase").to_numpy(zero_copy_only=False)
        order = np.argsort(u, kind="mergesort")
        u, conv = u[order], conv[order]
        first = np.empty(len(u), dtype=bool)
        first[0] = True
        first[1:] = u[1:] != u[:-1]
        starts = np.flatnonzero(first)
        anyc = np.logical_or.reduceat(conv, starts)
        uu = u[starts]
        return pa.table({
            "user_id": pa.array(uu), "conv": pa.array(anyc),
            "bucket": pa.array((uu % 64).astype(np.int32))})

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        u = g["user_id"].to_numpy(np.int64)
        c = g["conv"].to_numpy(bool)
        order = np.argsort(u, kind="mergesort")
        u, c = u[order], c[order]
        first = np.empty(len(u), dtype=bool)
        first[0] = True
        first[1:] = u[1:] != u[:-1]
        starts = np.flatnonzero(first)
        anyc = np.logical_or.reduceat(c, starts)
        var = (u[starts] % 2).astype(np.int64)
        return pd.DataFrame({
            "n_a": [int(np.sum(var == 0))],
            "conv_a": [int(np.sum(anyc[var == 0]))],
            "n_b": [int(np.sum(var == 1))],
            "conv_b": [int(np.sum(anyc[var == 1]))]})

    parts = (ds.map_batches(partial, batch_format="pyarrow")
             .groupby("bucket").map_groups(fold, batch_format="pandas")
             .to_pandas())
    n_a, conv_a = int(parts["n_a"].sum()), int(parts["conv_a"].sum())
    n_b, conv_b = int(parts["n_b"].sum()), int(parts["conv_b"].sum())
    a, b = conv_a, n_a - conv_a                 # 2×2 contingency
    c, d = conv_b, n_b - conv_b
    n = a + b + c + d
    denom = (a + b) * (c + d) * (a + c) * (b + d)
    chi2_micro = (n * (a * d - b * c) ** 2 * 1_000_000 // denom
                  if denom else 0)
    return pd.DataFrame({
        "n_a": [n_a], "conv_a": [conv_a],
        "rate_a_bps": [conv_a * 10000 // n_a if n_a else 0],
        "n_b": [n_b], "conv_b": [conv_b],
        "rate_b_bps": [conv_b * 10000 // n_b if n_b else 0],
        "chi2_micro": [chi2_micro]}).astype("int64")


def user_churn_labels(sf_dir: str) -> pd.DataFrame:
    """Point-in-time churn-label generation (the supervised-training
    shape: features STRICTLY before the cutoff, label strictly after,
    no leakage): with T = max event day + 1, users active in the
    feature window [T−28, T−14) get ``n_events_feat`` and
    ``churned`` = 1 iff they have NO event in the label window
    [T−14, T). Two pruned passes: a per-block max-day fold fixes T
    (driver folds one int per block), then per-block (user,
    n_feat, n_label) partials collapse through one ``user % 64``
    bucket exchange. SQL twin: two conditional aggregates against the
    same windows."""
    ds = _read(sf_dir, "events", columns=["user_id", "ts"])

    def maxday(t: pa.Table) -> pa.Table:
        day = t.column("ts").cast(pa.int64()).to_numpy() // _DAY_US
        return pa.table({"mx": pa.array([int(day.max())])})

    t_end = int(_read(sf_dir, "events", columns=["ts"])
                .map_batches(maxday, batch_format="pyarrow")
                .to_pandas()["mx"].max()) + 1

    def partial(t: pa.Table) -> pa.Table:
        u = t.column("user_id").to_numpy().astype(np.int64)
        day = t.column("ts").cast(pa.int64()).to_numpy() // _DAY_US
        feat = (day >= t_end - 28) & (day < t_end - 14)
        lab = day >= t_end - 14                  # day < t_end always
        m = feat | lab
        u, feat, lab = u[m], feat[m], lab[m]
        if len(u) == 0:
            return pa.table({"user_id": pa.array([], type=pa.int64()),
                             "n_feat": pa.array([], type=pa.int64()),
                             "n_lab": pa.array([], type=pa.int64()),
                             "bucket": pa.array([], type=pa.int32())})
        order = np.argsort(u, kind="mergesort")
        u, feat, lab = u[order], feat[order], lab[order]
        first = np.empty(len(u), dtype=bool)
        first[0] = True
        first[1:] = u[1:] != u[:-1]
        starts = np.flatnonzero(first)
        uu = u[starts]
        return pa.table({
            "user_id": pa.array(uu),
            "n_feat": pa.array(np.add.reduceat(
                feat.astype(np.int64), starts)),
            "n_lab": pa.array(np.add.reduceat(
                lab.astype(np.int64), starts)),
            "bucket": pa.array((uu % 64).astype(np.int32))})

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby("user_id", as_index=False)[
            ["n_feat", "n_lab"]].sum()
        out = out[out["n_feat"] > 0]
        return pd.DataFrame({
            "user_id": out["user_id"].to_numpy(np.int64),
            "n_events_feat": out["n_feat"].to_numpy(np.int64),
            "churned": (out["n_lab"].to_numpy(np.int64) == 0)
            .astype(np.int64)})

    out = (ds.map_batches(partial, batch_format="pyarrow")
           .groupby("bucket").map_groups(fold, batch_format="pandas")
           .to_pandas())
    return (out.sort_values("user_id", kind="mergesort")
            .reset_index(drop=True).astype("int64"))


def events_cumulative_users(sf_dir: str) -> pd.DataFrame:
    """Cumulative-adoption curve: per day, how many NEW users appear
    (first-ever event) and the running total of users seen so far,
    gapfilled to the full event-day range. Shape: per-block (user,
    min_day) partials (≤1 row per user per block) fold through one
    ``user % 64`` bucket exchange; each bucket then collapses to a
    constant-size day-grid bincount partial, and the driver folds
    |days|-sized vectors and takes one cumsum — never a per-user
    structure on the driver. SQL twin: MIN(day) per user + grid join +
    running SUM window."""
    ds = _read(sf_dir, "events", columns=["user_id", "ts"])

    def partial(t: pa.Table) -> pa.Table:
        u = t.column("user_id").to_numpy().astype(np.int64)
        day = t.column("ts").cast(pa.int64()).to_numpy() // _DAY_US
        order = np.argsort(u, kind="mergesort")
        u, day = u[order], day[order]
        first = np.empty(len(u), dtype=bool)
        first[0] = True
        first[1:] = u[1:] != u[:-1]
        starts = np.flatnonzero(first)
        uu = u[starts]
        return pa.table({
            "user_id": pa.array(uu),
            "min_day": pa.array(np.minimum.reduceat(day, starts)),
            "lo": pa.array(np.full(len(uu), int(day.min()))),
            "hi": pa.array(np.full(len(uu), int(day.max()))),
            "bucket": pa.array((uu % 64).astype(np.int32))})

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        f = g.groupby("user_id", as_index=False)["min_day"].min()
        d, n = np.unique(f["min_day"].to_numpy(np.int64),
                         return_counts=True)
        return pd.DataFrame({"day_id": d, "new_users": n.astype(np.int64),
                             "lo": int(g["lo"].min()),
                             "hi": int(g["hi"].max())})

    parts = (ds.map_batches(partial, batch_format="pyarrow")
             .groupby("bucket").map_groups(fold, batch_format="pandas")
             .to_pandas())
    lo, hi = int(parts["lo"].min()), int(parts["hi"].max())
    vec = np.zeros(hi - lo + 1, dtype=np.int64)
    agg = parts.groupby("day_id")["new_users"].sum()
    vec[agg.index.to_numpy(np.int64) - lo] = agg.to_numpy(np.int64)
    return pd.DataFrame({
        "day_id": np.arange(lo, hi + 1, dtype=np.int64),
        "new_users": vec,
        "cum_users": np.cumsum(vec)}).astype("int64")


def purchase_delta(sf_dir: str) -> pd.DataFrame:
    """Per-user LAG navigation: for every purchase with a predecessor,
    the value change (cents) since the user's previous purchase under
    the total order (ts, event_id) — the row-level lead/lag transform
    feature pipelines run before sequence models. Shape: filter to
    purchases AT THE READ (one pruned map), one ``user % 64`` bucket
    exchange, and the per-bucket kernel is a single lexsort + shifted
    subtraction where the first row of each user is masked out. SQL
    twin: LAG() OVER (PARTITION BY user ORDER BY t, event_id)."""
    ds = _read(sf_dir, "events",
               columns=["user_id", "event_id", "ts", "event_type",
                        "value"])

    def derive(t: pa.Table) -> pa.Table:
        m = pc.equal(t.column("event_type"), "purchase")
        t = t.filter(m)
        u = t.column("user_id").to_numpy().astype(np.int64)
        return pa.table({
            "user_id": pa.array(u),
            "event_id": t.column("event_id"),
            "ts_us": t.column("ts").cast(pa.int64()),
            "cents": pa.array(np.floor(t.column("value").to_numpy()
                                       * 100).astype(np.int64)),
            "bucket": pa.array((u % 64).astype(np.int32))})

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        u = g["user_id"].to_numpy(np.int64)
        e = g["event_id"].to_numpy(np.int64)
        ts = g["ts_us"].to_numpy(np.int64)
        c = g["cents"].to_numpy(np.int64)
        order = np.lexsort((e, ts, u))
        u, e, c = u[order], e[order], c[order]
        same = np.empty(len(u), dtype=bool)
        same[0] = False
        same[1:] = u[1:] == u[:-1]
        delta = np.empty(len(c), dtype=np.int64)
        delta[1:] = c[1:] - c[:-1]
        return pd.DataFrame({"user_id": u[same],
                             "event_id": e[same],
                             "delta_cents": delta[same]})

    out = (ds.map_batches(derive, batch_format="pyarrow")
           .groupby("bucket").map_groups(fold, batch_format="pandas")
           .to_pandas())
    return (out.sort_values(["user_id", "event_id"], kind="mergesort")
            .reset_index(drop=True).astype("int64"))


def events_ttest(sf_dir: str) -> pd.DataFrame:
    """Welch two-sample t-test (click vs purchase values) from EXACT
    int64 moment partials — the unequal-variance companion to
    ``events_mwu``: each block ships six integers, the driver folds
    them and evaluates Welch's t and the Welch–Satterthwaite df in
    float64 with the SAME operation order as the SQL twin (the
    ``lineitem_corr`` IEEE-matching discipline; sample variance via
    the n·Σx²−(Σx)² integer form). t_milli = floor(1000·t),
    df_milli = floor(1000·df)."""
    ds = _read(sf_dir, "events", columns=["event_type", "value"])

    def moments(t: pa.Table) -> pa.Table:
        et = t.column("event_type")
        v = np.floor(t.column("value").to_numpy() * 100).astype(np.int64)
        out = {}
        for name, lab in (("a", "click"), ("b", "purchase")):
            m = pc.equal(et, lab).to_numpy(zero_copy_only=False)
            x = v[m]
            out[f"n_{name}"] = [len(x)]
            out[f"s_{name}"] = [int(x.sum())]
            out[f"ss_{name}"] = [int((x * x).sum())]
        return pa.table(out)

    p = (ds.map_batches(moments, batch_format="pyarrow").to_pandas()
         .sum())
    na, sa, ssa = int(p["n_a"]), int(p["s_a"]), int(p["ss_a"])
    nb, sb, ssb = int(p["n_b"]), int(p["s_b"]), int(p["ss_b"])
    # IEEE closed form, mirrored term-for-term in the SQL twin
    va = (float(na) * float(ssa) - float(sa) * float(sa)) \
        / (float(na) * (float(na) - 1.0))
    vb = (float(nb) * float(ssb) - float(sb) * float(sb)) \
        / (float(nb) * (float(nb) - 1.0))
    sea = va / float(na)
    seb = vb / float(nb)
    t_stat = (float(sa) / float(na) - float(sb) / float(nb)) \
        / np.sqrt(sea + seb)
    df = (sea + seb) * (sea + seb) \
        / (sea * sea / (float(na) - 1.0)
           + seb * seb / (float(nb) - 1.0))
    return pd.DataFrame({
        "n_a": [na], "n_b": [nb],
        "t_milli": [int(np.floor(t_stat * 1000.0))],
        "df_milli": [int(np.floor(df * 1000.0))]}).astype("int64")


def events_trend_forecast(sf_dir: str, horizon: int = 7) -> pd.DataFrame:
    """Linear-trend forecast over the gapfilled daily-volume series in
    EXACT integers end to end: OLS slope/intercept on (day index,
    count) have integer numerators and denominators, so the fitted
    line and the ``horizon`` forecast days are exact rational
    arithmetic — slope_micro = num·10⁶ // den, forecasts floor-rounded
    from the same integers. Per-block day-bincount partials fold into
    one |days| vector on the driver (zero shuffle, the
    ``events_seasonal_backtest`` idiom). SQL twin: the same integer
    sums via aggregates over the day grid."""
    ds = _read(sf_dir, "events", columns=["ts"])

    def partial(t: pa.Table) -> pa.Table:
        day = t.column("ts").cast(pa.int64()).to_numpy() // _DAY_US
        u, cnt = np.unique(day, return_counts=True)
        return pa.table({"day": pa.array(u),
                         "n": pa.array(cnt.astype(np.int64))})

    parts = (ds.map_batches(partial, batch_format="pyarrow")
             .to_pandas().groupby("day", as_index=False)["n"].sum())
    lo = int(parts["day"].min())
    nd = int(parts["day"].max()) - lo + 1
    y = np.zeros(nd, dtype=np.int64)
    y[parts["day"].to_numpy(np.int64) - lo] = parts["n"].to_numpy(
        np.int64)
    x = np.arange(nd, dtype=np.int64)           # day index 0..nd-1
    n = nd
    sx, sy = int(x.sum()), int(y.sum())
    sxy, sxx = int((x * y).sum()), int((x * x).sum())
    num = n * sxy - sx * sy
    den = n * sxx - sx * sx
    # floor-division semantics must match DuckDB's `//` (truncation):
    # num can be negative, so compute both sides with explicit
    # sign-safe floor (DuckDB x//y truncates toward zero — mirror by
    # dividing magnitudes and re-applying the sign)
    def _tdiv(a: int, b: int) -> int:
        q = abs(a) // abs(b)
        return q if (a >= 0) == (b >= 0) else -q

    slope_micro = _tdiv(num * 1_000_000, den)
    icept_num = sy * den - num * sx             # intercept = this/(n*den)
    icept_micro = _tdiv(icept_num * 1_000_000, n * den)
    rows = []
    for h in range(1, horizon + 1):
        xf = nd - 1 + h
        # forecast = (icept_num + num*xf) / (n*den), floored the same way
        fnum = icept_num + num * xf * n
        rows.append((xf + lo, _tdiv(fnum, n * den)))
    out = pd.DataFrame(rows, columns=["day_id", "forecast"])
    out.insert(0, "slope_micro", slope_micro)
    out.insert(1, "icept_micro", icept_micro)
    return out.astype("int64")


def session_bounce_rate(sf_dir: str,
                        gap_us: int = 1_800_000_000) -> pd.DataFrame:
    """Bounce rate per user: share of 30-minute sessions containing a
    SINGLE event, in exact basis points — the engagement-quality cut
    every product-analytics stack reports. Same one-exchange
    sessionization as :func:`session_funnel_strict` (sort, gap-break
    cumsum); session sizes come from one reduceat and the per-user
    rollup never leaves the bucket. SQL twin: window sessionization +
    per-session counts."""
    ds = _read(sf_dir, "events", columns=["user_id", "ts"])

    def derive(t: pa.Table) -> pa.Table:
        u = t.column("user_id").to_numpy().astype(np.int64)
        return pa.table({
            "user_id": pa.array(u),
            "ts_us": t.column("ts").cast(pa.int64()),
            "bucket": pa.array((u % 64).astype(np.int32))})

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        u = g["user_id"].to_numpy(np.int64)
        ts = g["ts_us"].to_numpy(np.int64)
        order = np.lexsort((ts, u))
        u, ts = u[order], ts[order]
        n = len(u)
        newu = np.empty(n, dtype=bool)
        newu[0] = True
        newu[1:] = u[1:] != u[:-1]
        brk = newu.copy()
        brk[1:] |= (ts[1:] - ts[:-1]) > gap_us
        sstarts = np.flatnonzero(brk)
        sizes = np.diff(np.append(sstarts, n))
        user_of_sid = u[sstarts]
        nu = np.empty(len(sstarts), dtype=bool)
        nu[0] = True
        nu[1:] = user_of_sid[1:] != user_of_sid[:-1]
        ust = np.flatnonzero(nu)
        n_sessions = np.add.reduceat(
            np.ones(len(sizes), dtype=np.int64), ust)
        n_bounce = np.add.reduceat(
            (sizes == 1).astype(np.int64), ust)
        return pd.DataFrame({
            "user_id": user_of_sid[ust],
            "n_sessions": n_sessions, "n_bounce": n_bounce,
            "bounce_bps": n_bounce * 10000 // n_sessions})

    out = (ds.map_batches(derive, batch_format="pyarrow")
           .groupby("bucket").map_groups(fold, batch_format="pandas")
           .to_pandas())
    return (out.sort_values("user_id", kind="mergesort")
            .reset_index(drop=True).astype("int64"))


def events_props_stats(sf_dir: str) -> pd.DataFrame:
    """Semi-structured payload extraction: pull the integer ``k`` out
    of the JSON ``props`` column and profile it per event type — n,
    sum, and EXACT p50/p90 from a dense 100-cell bincount (k is
    bounded 0..99, so quantiles are a constant-size histogram fold,
    never a sort). The extraction is one vectorized RE2
    ``extract_regex`` per block (Arrow has no JSON kernel; the payload
    grammar here is single-key so first-integer extraction IS the JSON
    value — the SQL twin reads it through DuckDB's native ``->>`` to
    prove the two parses agree). Partials are |types|×100 cells."""
    ds = _read(sf_dir, "events", columns=["event_type", "props"])

    def partial(t: pa.Table) -> pa.Table:
        ex = pc.extract_regex(t.column("props"), r"(?P<k>\d+)")
        k = pc.struct_field(ex, "k").cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)
        df = pd.DataFrame({
            "event_type": t.column("event_type").to_pandas(), "k": k})
        g = (df.groupby(["event_type", "k"], as_index=False)
             .size().rename(columns={"size": "n"}))
        return pa.Table.from_pandas(g, preserve_index=False)

    cells = (ds.map_batches(partial, batch_format="pyarrow").to_pandas()
             .groupby(["event_type", "k"], as_index=False)["n"].sum())
    rows = []
    for et, g in cells.groupby("event_type"):
        k = g["k"].to_numpy(np.int64)
        n = g["n"].to_numpy(np.int64)
        order = np.argsort(k)
        k, n = k[order], n[order]
        tot = int(n.sum())
        cum = np.cumsum(n)
        # discrete lower quantile: smallest k with cum*q_den >= tot*q_num
        p50 = int(k[np.searchsorted(cum * 2, tot, side="left")])
        p90 = int(k[np.searchsorted(cum * 10, tot * 9, side="left")])
        rows.append((et, tot, int((k * n).sum()), p50, p90))
    out = pd.DataFrame(rows, columns=["event_type", "n", "sum_k",
                                      "k_p50", "k_p90"])
    return (out.sort_values("event_type", kind="mergesort")
            .reset_index(drop=True)
            .astype({"n": "int64", "sum_k": "int64",
                     "k_p50": "int64", "k_p90": "int64"}))


_SURVIVAL_GRID_MIN = (1, 2, 5, 10, 15, 30, 60, 120, 240, 480)


def events_survival_curve(sf_dir: str) -> pd.DataFrame:
    """Inter-event survival function: for each horizon k on a fixed
    minutes grid, the share of per-user consecutive-event gaps
    STRICTLY longer than k, in exact basis points — the hazard curve
    that tells a scheduler how long a user is likely to stay away.
    Gaps are derived per ``user % 64`` bucket under the total
    (ts, event_id) order; each bucket folds to an 11-counter partial
    (grid cells + total), so the exchange moves constant-size rows.
    SQL twin: LAG gaps × grid cross join."""
    ds = _read(sf_dir, "events", columns=["user_id", "event_id", "ts"])
    grid_us = np.array(_SURVIVAL_GRID_MIN, dtype=np.int64) * 60_000_000

    def derive(t: pa.Table) -> pa.Table:
        u = t.column("user_id").to_numpy().astype(np.int64)
        return pa.table({
            "user_id": pa.array(u),
            "event_id": t.column("event_id"),
            "ts_us": t.column("ts").cast(pa.int64()),
            "bucket": pa.array((u % 64).astype(np.int32))})

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        u = g["user_id"].to_numpy(np.int64)
        e = g["event_id"].to_numpy(np.int64)
        ts = g["ts_us"].to_numpy(np.int64)
        order = np.lexsort((e, ts, u))
        u, ts = u[order], ts[order]
        same = u[1:] == u[:-1]
        gaps = (ts[1:] - ts[:-1])[same]
        counts = (gaps[None, :] > grid_us[:, None]).sum(axis=1) \
            if len(gaps) else np.zeros(len(grid_us), dtype=np.int64)
        return pd.DataFrame({
            "k_min": np.asarray(_SURVIVAL_GRID_MIN, dtype=np.int64),
            "n_gt": counts.astype(np.int64),
            "n_gaps": np.int64(len(gaps))})

    parts = (ds.map_batches(derive, batch_format="pyarrow")
             .groupby("bucket").map_groups(fold, batch_format="pandas")
             .to_pandas())
    agg = parts.groupby("k_min", as_index=False).sum()
    # each bucket repeats its n_gaps on all |grid| rows → sum/|grid|
    tot = int(agg["n_gaps"].sum()) // len(_SURVIVAL_GRID_MIN)
    return pd.DataFrame({
        "k_min": agg["k_min"].to_numpy(np.int64),
        "n_gt": agg["n_gt"].to_numpy(np.int64),
        "survival_bps": agg["n_gt"].to_numpy(np.int64) * 10000
        // max(tot, 1),
        "n_gaps": tot}).astype("int64")


def events_calibration_bins(sf_dir: str) -> pd.DataFrame:
    """Reliability-diagram binning: events bucketed into fixed
    $10-wide value bins (capped at bin 40) and scored by the exact
    purchase share per bin in basis points — the calibration readout
    an eval harness produces for a propensity score. Constant-size
    per-block partials (≤41 bins × 2 counters), zero shuffle. SQL
    twin: integer bin arithmetic + conditional aggregate."""
    ds = _read(sf_dir, "events", columns=["event_type", "value"])

    def partial(t: pa.Table) -> pa.Table:
        cents = np.floor(t.column("value").to_numpy() * 100) \
            .astype(np.int64)
        b = np.minimum(cents // 1000, 40)
        purch = pc.equal(t.column("event_type"), "purchase") \
            .to_numpy(zero_copy_only=False)
        nb = np.bincount(b, minlength=41).astype(np.int64)
        np_ = np.bincount(b[purch], minlength=41).astype(np.int64)
        keep = nb > 0
        return pa.table({
            "bin": pa.array(np.flatnonzero(keep).astype(np.int64)),
            "n": pa.array(nb[keep]),
            "n_purchase": pa.array(np_[keep])})

    agg = (ds.map_batches(partial, batch_format="pyarrow").to_pandas()
           .groupby("bin", as_index=False).sum())
    n = agg["n"].to_numpy(np.int64)
    return pd.DataFrame({
        "bin": agg["bin"].to_numpy(np.int64),
        "n": n,
        "n_purchase": agg["n_purchase"].to_numpy(np.int64),
        "purchase_bps": agg["n_purchase"].to_numpy(np.int64)
        * 10000 // n}).astype("int64")


def user_distinct_kmv(sf_dir: str, k: int = 64) -> pd.DataFrame:
    """KMV (k-minimum-values) bottom-k distinct-count sketch per event
    type — the mergeable cardinality sketch whose state is k hashes
    regardless of input size (the 100-TB answer to COUNT(DISTINCT)).
    Each block keeps the k smallest DISTINCT 60-bit md5 hashes of the
    user ids it saw (≤ k rows per type per block leave the map stage);
    the driver merge is the KMV union: merge-dedup-truncate. The
    estimator ``(k-1)·2^60 // kth_min`` is exact integer arithmetic,
    and when fewer than k distinct hashes exist the sketch degrades to
    the EXACT distinct count — so the SQL twin (same md5 top-60-bit
    parse, window-ranked kth hash, HUGEINT estimator) matches
    bit-for-bit on both branches."""
    from ..functions.hashing import hash64_many

    ds = _read(sf_dir, "events", columns=["user_id", "event_type"])

    def partial(t: pa.Table) -> pa.Table:
        et = np.asarray(t.column("event_type")).astype(object)
        uid = t.column("user_id").to_numpy()
        types, hs = [], []
        for ty in np.unique(et):
            u = np.unique(uid[et == ty])
            h = np.unique(hash64_many([str(x) for x in u])
                          >> np.uint64(4))
            keep = h if len(h) <= k else np.partition(h, k - 1)[:k]
            types.extend([str(ty)] * len(keep))
            hs.append(np.sort(keep).astype(np.int64))
        flat = np.concatenate(hs) if hs else np.array([], dtype=np.int64)
        return pa.table({"event_type": pa.array(types, type=pa.string()),
                         "h": pa.array(flat)})

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    rows = []
    for ty, g in parts.groupby("event_type"):
        h = np.unique(g["h"].to_numpy(np.int64))
        k_used = min(len(h), k)
        kth = int(h[k_used - 1])
        est = ((k - 1) * (1 << 60)) // kth if len(h) >= k else len(h)
        rows.append((ty, k_used, kth, est))
    out = pd.DataFrame(rows, columns=["event_type", "k_used",
                                      "kth_hash", "est_distinct"])
    return (out.sort_values("event_type", kind="mergesort")
            .reset_index(drop=True)
            .astype({"k_used": "int64", "kth_hash": "int64",
                     "est_distinct": "int64"}))


def events_dedup_burst(sf_dir: str, window_s: int = 60) -> pd.DataFrame:
    """Telemetry burst-duplicate suppression readout: an event is a
    burst duplicate when the PREVIOUS event of the same (user, type) —
    under the total (ts, event_id) order — is within ``window_s``
    seconds; per type we report total, duplicate and kept counts plus
    the duplicate share in exact basis points. The LAG-gap rule (vs
    previous ROW, not previous kept row) is what keeps the operator
    one vectorized shifted compare per bucket instead of a sequential
    recurrence. One ``user % 64`` bucket exchange; each bucket folds
    to a |types|-row partial."""
    ds = _read(sf_dir, "events",
               columns=["user_id", "event_type", "ts", "event_id"])

    def derive(t: pa.Table) -> pa.Table:
        u = t.column("user_id").to_numpy().astype(np.int64)
        return pa.table({
            "user_id": pa.array(u),
            "event_type": t.column("event_type"),
            "ts_us": t.column("ts").cast(pa.int64()),
            "event_id": t.column("event_id"),
            "bucket": pa.array((u % 64).astype(np.int32))})

    win_us = window_s * 1_000_000

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        u = g["user_id"].to_numpy(np.int64)
        codes, uniq = pd.factorize(g["event_type"].to_numpy())
        ts = g["ts_us"].to_numpy(np.int64)
        e = g["event_id"].to_numpy(np.int64)
        order = np.lexsort((e, ts, codes, u))
        us, cs, tss = u[order], codes[order], ts[order]
        dup = np.zeros(len(us), dtype=bool)
        dup[1:] = ((us[1:] == us[:-1]) & (cs[1:] == cs[:-1])
                   & (tss[1:] - tss[:-1] <= win_us))
        n = np.bincount(cs, minlength=len(uniq)).astype(np.int64)
        ndup = np.bincount(cs[dup], minlength=len(uniq)).astype(np.int64)
        return pd.DataFrame({"event_type": uniq.astype(str),
                             "n": n, "n_dup": ndup})

    parts = (ds.map_batches(derive, batch_format="pyarrow")
             .groupby("bucket").map_groups(fold, batch_format="pandas")
             .to_pandas())
    agg = parts.groupby("event_type", as_index=False).sum()
    n = agg["n"].to_numpy(np.int64)
    ndup = agg["n_dup"].to_numpy(np.int64)
    out = pd.DataFrame({
        "event_type": agg["event_type"],
        "n": n, "n_dup": ndup, "n_kept": n - ndup,
        "dup_bps": ndup * 10000 // n})
    return (out.sort_values("event_type", kind="mergesort")
            .reset_index(drop=True)
            .astype({"n": "int64", "n_dup": "int64",
                     "n_kept": "int64", "dup_bps": "int64"}))


def embedding_norm_outliers(sf_dir: str, topk: int = 10) -> pd.DataFrame:
    """Embedding-corpus norm outliers — the degenerate-vector audit a
    retrieval index build runs first (all-zero, truncated or blown-up
    vectors surface at the extremes of the norm distribution). Squared
    L2 norms in exact 1e-3 fixed point (``floor(v·1000)`` per element,
    int64 sum of squares — same parse as ``embedding_sim_hist``); each
    block emits only its ``topk`` highest / lowest candidate rows under
    the deterministic (sq_norm, vec_id) tie order, so the driver merge
    is candidate-sized. Output: both extremes with ranks."""
    ds = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet",
                               columns=["vec_id", "embedding"])

    def partial(t: pa.Table) -> pa.Table:
        arr = t.column("embedding").combine_chunks()
        flat = arr.flatten().to_numpy(zero_copy_only=False)
        dim = len(flat) // len(arr)
        iv = np.floor(flat.astype(np.float64) * 1000.0) \
            .astype(np.int64).reshape(-1, dim)
        sq = (iv * iv).sum(axis=1)
        vid = t.column("vec_id").to_numpy().astype(np.int64)
        lo_c = np.lexsort((vid, sq))[:topk]
        hi_c = np.lexsort((vid, -sq))[:topk]
        keep = np.unique(np.concatenate([lo_c, hi_c]))
        return pa.table({"vec_id": pa.array(vid[keep]),
                         "sq": pa.array(sq[keep])})

    cand = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    vid = cand["vec_id"].to_numpy(np.int64)
    sq = cand["sq"].to_numpy(np.int64)
    hi = np.lexsort((vid, -sq))[:topk]
    lo = np.lexsort((vid, sq))[:topk]
    out = pd.DataFrame({
        "side": ["high"] * len(hi) + ["low"] * len(lo),
        "rk": np.concatenate([np.arange(1, len(hi) + 1),
                              np.arange(1, len(lo) + 1)]),
        "vec_id": np.concatenate([vid[hi], vid[lo]]),
        "sq_norm_fp": np.concatenate([sq[hi], sq[lo]])})
    return out.astype({"rk": "int64", "vec_id": "int64",
                       "sq_norm_fp": "int64"})


def user_growth_accounting(sf_dir: str) -> pd.DataFrame:
    """Growth-accounting waterfall (the product-analytics decomposition
    of weekly active users): every active (user, week) pair is classified
    NEW (no earlier active week), RETAINED (active the immediately
    preceding week) or RESURRECTED (returning after a gap), and CHURNED
    at week w counts users active in some week < w whose next activity
    is not w-1's successor (i.e. active at w-1, silent at w). Weeks are
    pure-integer ``epoch_days // 7`` — no calendar library on either
    side. One ``user % 64`` bucket exchange over DEDUPED (user, week)
    pairs; each bucket folds to per-week counters via np.unique on a
    packed ``user·2^32 + week`` key, so the driver merge is
    week-cardinality. Churn rows past the last globally active week are
    dropped after the merge (the data simply ends there)."""
    ds = _read(sf_dir, "events", columns=["user_id", "ts"])

    def derive(t: pa.Table) -> pa.Table:
        u = t.column("user_id").to_numpy().astype(np.int64)
        days = t.column("ts").cast(pa.int64()).to_numpy() // 86_400_000_000
        return pa.table({"pack": pa.array(u * (1 << 32) + days // 7),
                         "bucket": pa.array((u % 64).astype(np.int32))})

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        pairs = np.unique(g["pack"].to_numpy(np.int64))
        uu, ww = pairs >> 32, pairs & 0xFFFFFFFF
        same_prev = np.zeros(len(pairs), dtype=bool)
        same_prev[1:] = uu[1:] == uu[:-1]
        gap = np.zeros(len(pairs), dtype=np.int64)
        gap[1:] = ww[1:] - ww[:-1]
        new = ~same_prev
        ret = same_prev & (gap == 1)
        res = same_prev & (gap > 1)
        # churn attributed at w+1 when the user's NEXT pair is not w+1
        last_of_user = np.ones(len(pairs), dtype=bool)
        last_of_user[:-1] = uu[:-1] != uu[1:]
        next_gap = np.zeros(len(pairs), dtype=np.int64)
        next_gap[:-1] = ww[1:] - ww[:-1]
        churn = last_of_user | (next_gap > 1)
        weeks = np.unique(np.concatenate([ww, ww[churn] + 1]))
        idx = np.searchsorted(weeks, ww)

        def cnt(mask):
            return np.bincount(idx[mask], minlength=len(weeks))

        cidx = np.searchsorted(weeks, ww[churn] + 1)
        return pd.DataFrame({
            "week": weeks,
            "n_active": cnt(np.ones(len(pairs), dtype=bool)),
            "n_new": cnt(new), "n_retained": cnt(ret),
            "n_resurrected": cnt(res),
            "n_churned": np.bincount(cidx, minlength=len(weeks))})

    parts = (ds.map_batches(derive, batch_format="pyarrow")
             .groupby("bucket").map_groups(fold, batch_format="pandas")
             .to_pandas())
    agg = parts.groupby("week", as_index=False).sum()
    max_active = int(agg.loc[agg["n_active"] > 0, "week"].max())
    agg = agg[agg["week"] <= max_active].copy()
    agg.insert(1, "week_start_day", agg["week"] * 7)
    return (agg.sort_values("week", kind="mergesort").reset_index(drop=True)
            .astype({c: "int64" for c in agg.columns}))


def events_target_encode(sf_dir: str) -> pd.DataFrame:
    """Leakage-safe leave-one-out target encoding — the ML feature-prep
    staple: each event's category (event_type) is replaced by the mean
    target (value cents) of all OTHER rows of that category, so the
    row's own label never leaks into its feature. Exact integers:
    ``(sum_cents[type] − own_cents) // (n[type] − 1)`` (numerator is
    non-negative, so floor == truncate on both sides). Pass 1 folds
    |types|-row (n, sum) partials per block (zero shuffle); pass 2
    broadcasts the 5-row map and emits the deterministic
    ``event_id % 97`` sample of encoded rows."""
    ds = _read(sf_dir, "events", columns=["event_type", "value"])

    def partial(t: pa.Table) -> pa.Table:
        codes, uniq = pd.factorize(t.column("event_type").to_pandas())
        cents = np.floor(t.column("value").to_numpy() * 100).astype(np.int64)
        return pa.table({
            "event_type": pa.array(uniq.astype(str)),
            "n": pa.array(np.bincount(codes, minlength=len(uniq))
                          .astype(np.int64)),
            "s": pa.array(np.bincount(codes, weights=cents,
                                      minlength=len(uniq))
                          .astype(np.int64))})

    stats = (ds.map_batches(partial, batch_format="pyarrow").to_pandas()
             .groupby("event_type", as_index=False).sum())
    n_map = dict(zip(stats["event_type"], stats["n"].astype(np.int64)))
    s_map = dict(zip(stats["event_type"], stats["s"].astype(np.int64)))

    ds2 = _read(sf_dir, "events", columns=["event_id", "event_type",
                                           "value"])

    def encode(t: pa.Table) -> pa.Table:
        eid = t.column("event_id").to_numpy().astype(np.int64)
        keep = eid % 97 == 0
        eid = eid[keep]
        et = t.column("event_type").to_pandas().to_numpy()[keep]
        cents = np.floor(t.column("value").to_numpy() * 100) \
            .astype(np.int64)[keep]
        codes, uniq = pd.factorize(et)
        n = np.array([n_map[x] for x in uniq], dtype=np.int64)[codes]
        s = np.array([s_map[x] for x in uniq], dtype=np.int64)[codes]
        enc = np.where(n > 1, (s - cents) // np.maximum(n - 1, 1), -1)
        return pa.table({"event_id": pa.array(eid),
                         "event_type": pa.array(et.astype(str)),
                         "value_cents": pa.array(cents),
                         "loo_enc_cents": pa.array(enc)})

    out = (ds2.map_batches(encode, batch_format="pyarrow").to_pandas()
           .sort_values("event_id", kind="mergesort")
           .reset_index(drop=True))
    return out.astype({"event_id": "int64", "value_cents": "int64",
                       "loo_enc_cents": "int64"})


def events_randomization_test(sf_dir: str, n_reps: int = 64) -> pd.DataFrame:
    """Deterministic randomization (random-relabel) test for the
    purchase-vs-click value difference. The observed statistic is the
    cross-multiplied mean gap ``|s1·n0 − s0·n1|`` in exact integers (no
    float means); each of the 64 replicates relabels every pooled row by
    one BIT-PLANE of the row's md5: bit r of ``hash64(str(event_id))``
    — one hash per row yields all 64 independent relabelings, and the
    SQL twin extracts the identical bits from
    ``('0x' || substr(md5(id), 1, 16))::UBIGINT``. Per-block partials
    are a fixed 65×(n, s) counter block (zero shuffle); p-value in basis
    points is ``10000·#{stat_r ≥ obs} // reps``. Replicates split
    binomially rather than at fixed group sizes — a randomization test,
    documented, not an exact permutation."""
    from ..functions.hashing import hash64_many

    ds = _read(sf_dir, "events",
               columns=["event_id", "event_type", "value"])
    shifts = np.arange(n_reps, dtype=np.uint64)

    def partial(t: pa.Table) -> pa.Table:
        et = t.column("event_type").to_pandas().to_numpy()
        keep = (et == "purchase") | (et == "click")
        if not keep.any():
            return pa.table({"rep": pa.array([], pa.int64()),
                             "n1": pa.array([], pa.int64()),
                             "s1": pa.array([], pa.int64())})
        eid = t.column("event_id").to_numpy().astype(np.int64)[keep]
        cents = np.floor(t.column("value").to_numpy() * 100) \
            .astype(np.int64)[keep]
        is_p = et[keep] == "purchase"
        h = hash64_many(str(x) for x in eid)
        bits = ((h[:, None] >> shifts[None, :])
                & np.uint64(1)).astype(np.int64)
        n1 = bits.sum(axis=0)
        s1 = (bits * cents[:, None]).sum(axis=0)
        rep = np.arange(n_reps, dtype=np.int64)
        return pa.table({
            "rep": pa.array(np.concatenate([rep, [-1, -2]])),
            "n1": pa.array(np.concatenate(
                [n1, [int(is_p.sum()), len(eid)]])),
            "s1": pa.array(np.concatenate(
                [s1, [int(cents[is_p].sum()), int(cents.sum())]]))})

    parts = (ds.map_batches(partial, batch_format="pyarrow").to_pandas()
             .groupby("rep", as_index=False).sum())
    by = {int(r): (int(n), int(s))
          for r, n, s in zip(parts["rep"], parts["n1"], parts["s1"])}
    n_tot, s_tot = by[-2]
    n1o, s1o = by[-1]
    obs = abs(s1o * (n_tot - n1o) - (s_tot - s1o) * n1o)
    rows = [(-1, n1o, obs, 1)]
    for r in range(n_reps):
        n1, s1 = by[r]
        stat = abs(s1 * (n_tot - n1) - (s_tot - s1) * n1)
        rows.append((r, n1, stat, int(stat >= obs)))
    return pd.DataFrame(rows, columns=["rep", "n_side1", "stat", "ge_obs"]) \
        .astype("int64")


def lineitem_zorder_layout(sf_dir: str) -> pd.DataFrame:
    """Z-order (Morton-curve) storage-layout audit — the clustering key
    a lakehouse compaction job would sort on to get 2-D data-skipping
    on (partkey, suppkey). Both 16-bit dims are bit-interleaved with
    the classic shift-and-mask expansion (identical integer expression
    chain in numpy and in the SQL twin, where the scalar max row is
    UNION-ALLed through the same chain so the interleave is written
    once); rows land in 256 z-ranges via ``z // zdiv`` with
    ``zdiv = z(max_a, max_b) // 256 + 1`` — scale-adaptive with no data
    sample. Output per occupied z-range: row count plus each dim's
    min/max, the exact min/max the reader's data-skipping index would
    store per file. Pass 1 is a 1-row-per-block max fold; pass 2 folds
    ≤256-row partials; zero shuffle."""
    def ileave(x: np.ndarray | int):
        x = x & 0xFFFF
        x = (x | (x << 8)) & 0x00FF00FF
        x = (x | (x << 4)) & 0x0F0F0F0F
        x = (x | (x << 2)) & 0x33333333
        return (x | (x << 1)) & 0x55555555

    ds = _read(sf_dir, "lineitem", columns=["l_partkey", "l_suppkey"])

    def maxes(t: pa.Table) -> pa.Table:
        a = t.column("l_partkey").to_numpy().astype(np.int64) & 0xFFFF
        b = t.column("l_suppkey").to_numpy().astype(np.int64) & 0xFFFF
        return pa.table({"ma": pa.array([int(a.max())]),
                         "mb": pa.array([int(b.max())])})

    mx = ds.map_batches(maxes, batch_format="pyarrow").to_pandas()
    zdiv = (ileave(int(mx["ma"].max())) | (ileave(int(mx["mb"].max())) << 1)
            ) // 256 + 1

    def partial(t: pa.Table) -> pd.DataFrame:
        a = t.column("l_partkey").to_numpy().astype(np.int64) & 0xFFFF
        b = t.column("l_suppkey").to_numpy().astype(np.int64) & 0xFFFF
        bucket = (ileave(a) | (ileave(b) << 1)) // zdiv
        order = np.lexsort((b, a, bucket))
        bs, as_, bs2 = bucket[order], a[order], b[order]
        starts = np.flatnonzero(np.r_[True, bs[1:] != bs[:-1]])
        ends = np.r_[starts[1:], len(bs)]
        return pd.DataFrame({
            "bucket": bs[starts],
            "n": ends - starts,
            "min_part": np.minimum.reduceat(as_, starts),
            "max_part": np.maximum.reduceat(as_, starts),
            "min_supp": np.minimum.reduceat(bs2, starts),
            "max_supp": np.maximum.reduceat(bs2, starts)})

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    agg = parts.groupby("bucket", as_index=False).agg(
        n=("n", "sum"), min_part=("min_part", "min"),
        max_part=("max_part", "max"), min_supp=("min_supp", "min"),
        max_supp=("max_supp", "max"))
    return (agg.sort_values("bucket", kind="mergesort")
            .reset_index(drop=True).astype("int64"))


def user_lifetime_km(sf_dir: str, censor_days: int = 3) -> pd.DataFrame:
    """Kaplan–Meier survival curve over user LIFETIMES (days between a
    user's first and last activity), with right-censoring for users
    still active in the final ``censor_days`` of the observation window
    — the retention analysis that naive "average lifetime" gets wrong
    because it treats still-active users as dead. The survival estimate
    is the sequential integer recurrence
    ``s_i = s_{i-1} · (n_risk − n_event) // n_risk`` in basis points,
    reproduced exactly by the SQL twin's RECURSIVE CTE — the product
    form never touches floats on either side. Pass 1 is a 1-row-per-
    block max-day fold (zero shuffle, sets the censoring horizon);
    pass 2 is one ``user % 64`` bucket exchange folding per-user
    (first, last) via lexsort+reduceat into per-duration counters, so
    the driver recursion runs on the duration grid (≤ observation-span
    rows at any data scale)."""
    ds = _read(sf_dir, "events", columns=["user_id", "ts"])

    def maxday(t: pa.Table) -> pa.Table:
        d = t.column("ts").cast(pa.int64()).to_numpy() // 86_400_000_000
        return pa.table({"mx": pa.array([int(d.max())])})

    horizon = int(ds.map_batches(maxday, batch_format="pyarrow")
                  .to_pandas()["mx"].max()) - (censor_days - 1)

    def derive(t: pa.Table) -> pa.Table:
        u = t.column("user_id").to_numpy().astype(np.int64)
        d = t.column("ts").cast(pa.int64()).to_numpy() // 86_400_000_000
        return pa.table({"user_id": pa.array(u), "day": pa.array(d),
                         "bucket": pa.array((u % 64).astype(np.int32))})

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        u = g["user_id"].to_numpy(np.int64)
        d = g["day"].to_numpy(np.int64)
        order = np.lexsort((d, u))
        us, dsrt = u[order], d[order]
        starts = np.flatnonzero(np.r_[True, us[1:] != us[:-1]])
        ends = np.r_[starts[1:], len(us)]
        first, last = dsrt[starts], dsrt[ends - 1]
        dur = last - first
        cens = (last >= horizon).astype(np.int64)
        grid = np.unique(dur)
        idx = np.searchsorted(grid, dur)
        return pd.DataFrame({
            "dur": grid,
            "n_tot": np.bincount(idx, minlength=len(grid)),
            "n_event": np.bincount(idx[cens == 0], minlength=len(grid)),
            "n_cens": np.bincount(idx[cens == 1], minlength=len(grid))})

    parts = (ds.map_batches(derive, batch_format="pyarrow")
             .groupby("bucket").map_groups(fold, batch_format="pandas")
             .to_pandas())
    agg = (parts.groupby("dur", as_index=False).sum()
           .sort_values("dur", kind="mergesort").reset_index(drop=True))
    n_tot = agg["n_tot"].to_numpy(np.int64)
    n_event = agg["n_event"].to_numpy(np.int64)
    n_risk = int(n_tot.sum()) - np.concatenate(([0], n_tot.cumsum()[:-1]))
    s = 10_000
    s_bps = []
    for r, e in zip(n_risk, n_event):
        s = s * (int(r) - int(e)) // int(r)
        s_bps.append(s)
    return pd.DataFrame({
        "duration_days": agg["dur"], "n_risk": n_risk,
        "n_event": n_event, "n_censored": agg["n_cens"],
        "s_bps": np.array(s_bps, dtype=np.int64)}).astype("int64")


def lineitem_revenue_bridge(sf_dir: str) -> pd.DataFrame:
    """Month-over-month revenue bridge (the finance waterfall): each
    month's revenue delta decomposed into PRICE effect, VOLUME effect,
    residual (joint) effect, NEW-part revenue and EXITED-part drag, per
    part and then rolled up — the identity
    ``d_rev = price + volume + residual + new − exit`` holds EXACTLY
    because every term is integer cents with the same truncating
    division on both sides (``rev2·q1 // q2 − rev1`` etc., nonnegative
    operands so floor == truncate). One ``part % 64`` bucket exchange
    over the (part, month) rollup; per-part LAG classification is a
    vectorized consecutive-diff inside the bucket; the driver fold is
    month-grid-sized. Gap months: a part absent for k months exits at
    silence start and re-enters as NEW, keeping the identity through
    zero-revenue months."""
    ds = _read(sf_dir, "lineitem",
               columns=["l_partkey", "l_shipdate", "l_extendedprice",
                        "l_quantity"])

    def derive(t: pa.Table) -> pa.Table:
        k = t.column("l_partkey").to_numpy().astype(np.int64)
        m = t.column("l_shipdate").to_numpy().astype("datetime64[M]") \
            .astype(np.int64)
        rev = np.floor(t.column("l_extendedprice").to_numpy() * 100) \
            .astype(np.int64)
        q = t.column("l_quantity").to_numpy().astype(np.int64)
        return pa.table({"k": pa.array(k), "m": pa.array(m),
                         "rev": pa.array(rev), "q": pa.array(q),
                         "bucket": pa.array((k % 64).astype(np.int32))})

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        # collapse to per-(part, month) rollup inside the bucket
        pack = g["k"].to_numpy(np.int64) * (1 << 20) + g["m"].to_numpy(
            np.int64)
        uniq, inv = np.unique(pack, return_inverse=True)
        rev = np.bincount(inv, weights=g["rev"].to_numpy(np.int64)) \
            .astype(np.int64)
        q = np.bincount(inv, weights=g["q"].to_numpy(np.int64)) \
            .astype(np.int64)
        k, m = uniq >> 20, uniq & ((1 << 20) - 1)
        same = np.zeros(len(uniq), dtype=bool)
        same[1:] = k[1:] == k[:-1]
        gap = np.zeros(len(uniq), dtype=np.int64)
        gap[1:] = m[1:] - m[:-1]
        cont = same & (gap == 1)
        new = ~cont
        # exit at m+1 when the part's next month is not m+1
        last = np.ones(len(uniq), dtype=bool)
        last[:-1] = k[:-1] != k[1:]
        ngap = np.zeros(len(uniq), dtype=np.int64)
        ngap[:-1] = m[1:] - m[:-1]
        exit_ = last | (ngap > 1)
        prev_rev = np.concatenate(([0], rev[:-1]))
        prev_q = np.concatenate(([0], q[:-1]))
        pe = np.where(cont, rev * prev_q // np.maximum(q, 1) - prev_rev, 0)
        ve = np.where(cont,
                      prev_rev * q // np.maximum(prev_q, 1) - prev_rev, 0)
        dc = np.where(cont, rev - prev_rev, 0)
        months = np.unique(np.concatenate([m, m[exit_] + 1]))
        mi = np.searchsorted(months, m)
        xe = np.searchsorted(months, m[exit_] + 1)

        def agg(v, where=None):
            src = mi if where is None else mi[where]
            vv = v if where is None else v[where]
            return np.bincount(src, weights=vv, minlength=len(months)) \
                .astype(np.int64)

        return pd.DataFrame({
            "m": months, "rev": agg(rev), "pe": agg(pe), "ve": agg(ve),
            "dc": agg(dc), "new_rev": agg(rev, new),
            "exit_rev": np.bincount(xe, weights=rev[exit_],
                                    minlength=len(months))
            .astype(np.int64)})

    parts = (ds.map_batches(derive, batch_format="pyarrow")
             .groupby("bucket").map_groups(fold, batch_format="pandas")
             .to_pandas())
    agg = (parts.groupby("m", as_index=False).sum()
           .sort_values("m", kind="mergesort").reset_index(drop=True))
    # real data months only: exit rows extend one month past the last
    # revenue month (every month with rows has rev >= 1 cent)
    has_rev = agg.loc[agg["rev"] > 0, "m"]
    mn, mx = int(has_rev.min()), int(has_rev.max())
    agg = agg[(agg["m"] >= mn) & (agg["m"] <= mx)]
    grid = pd.DataFrame({"m": np.arange(mn, mx + 1, dtype=np.int64)})
    agg = grid.merge(agg, on="m", how="left").fillna(0)
    rev = agg["rev"].to_numpy(np.int64)
    out = pd.DataFrame({
        "month_index": agg["m"].to_numpy(np.int64),
        "rev_cents": rev,
        "d_rev": rev - np.concatenate(([0], rev[:-1])),
        "price_eff": agg["pe"].to_numpy(np.int64),
        "volume_eff": agg["ve"].to_numpy(np.int64),
        "residual": (agg["dc"].to_numpy(np.int64)
                     - agg["pe"].to_numpy(np.int64)
                     - agg["ve"].to_numpy(np.int64)),
        "new_rev": agg["new_rev"].to_numpy(np.int64),
        "exit_rev": agg["exit_rev"].to_numpy(np.int64)})
    return out.iloc[1:].reset_index(drop=True).astype("int64")


def events_peak_concurrency(sf_dir: str, gap_us: int = 1_800_000_000,
                            topk: int = 10) -> pd.DataFrame:
    """Peak-concurrency sweep: sessionize per user (same >30-min-gap
    rule as ``user_sessions``), extend each session ``gap_us`` past its
    last event, and find the minutes with the most concurrently active
    sessions — the capacity-planning number. The sweep is the classic
    +1/−1 difference trick, but DISTRIBUTED: each bucket emits only
    per-minute delta partials (+1 at session start minute, −1 after its
    end), the driver folds deltas → running sum → top-k breakpoints
    under the (concurrency desc, minute asc) tie order. Concurrency is
    a step function, so every local max occurs at a delta breakpoint —
    evaluating only those minutes is exact, and the driver holds
    distinct-breakpoint rows, not the timeline (at 100-TB scale the
    cumsum would shard by time range with carry-in partials, same
    partials)."""
    ds = _read(sf_dir, "events", columns=["user_id", "ts", "event_id"])

    def derive(t: pa.Table) -> pa.Table:
        u = t.column("user_id").to_numpy().astype(np.int64)
        return pa.table({
            "user_id": pa.array(u),
            "ts_us": t.column("ts").cast(pa.int64()),
            "event_id": t.column("event_id"),
            "bucket": pa.array((u % 64).astype(np.int32))})

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        u = g["user_id"].to_numpy(np.int64)
        ts = g["ts_us"].to_numpy(np.int64)
        e = g["event_id"].to_numpy(np.int64)
        order = np.lexsort((e, ts, u))
        us, tss = u[order], ts[order]
        brk = np.ones(len(us), dtype=bool)
        brk[1:] = (us[1:] != us[:-1]) | (tss[1:] - tss[:-1] > gap_us)
        starts = np.flatnonzero(brk)
        ends = np.r_[starts[1:], len(us)]
        m0 = tss[starts] // 60_000_000
        m1 = (tss[ends - 1] + gap_us) // 60_000_000
        deltas = np.concatenate([m0, m1 + 1])
        sign = np.concatenate([np.ones(len(m0), dtype=np.int64),
                               -np.ones(len(m0), dtype=np.int64)])
        uniq, inv = np.unique(deltas, return_inverse=True)
        return pd.DataFrame({
            "minute": uniq,
            "delta": np.bincount(inv, weights=sign, minlength=len(uniq))
            .astype(np.int64)})

    parts = (ds.map_batches(derive, batch_format="pyarrow")
             .groupby("bucket").map_groups(fold, batch_format="pandas")
             .to_pandas())
    d = (parts.groupby("minute", as_index=False)["delta"].sum()
         .sort_values("minute", kind="mergesort").reset_index(drop=True))
    conc = d["delta"].to_numpy(np.int64).cumsum()
    minutes = d["minute"].to_numpy(np.int64)
    order = np.lexsort((minutes, -conc))[:topk]
    return pd.DataFrame({
        "rk": np.arange(1, len(order) + 1, dtype=np.int64),
        "minute": minutes[order],
        "concurrency": conc[order]}).astype("int64")


def part_price_index(sf_dir: str) -> pd.DataFrame:
    """Matched-basket Laspeyres and Paasche PRICE INDICES per month vs
    the first traded month — the inflation-audit readout over the fact
    table. For each month t, the basket is the parts traded in BOTH the
    base month and t; unit prices never materialize: the per-part terms
    are ``rev_t·q_0 // q_t`` (Laspeyres numerator) and
    ``rev_0·q_t // q_0`` (Paasche denominator), exact nonnegative
    integer cents with truncating division mirrored by the HUGEINT SQL
    twin. Pass 1 is a 1-row-per-block min-month fold (sets the global
    base month); pass 2 is one ``part % 64`` bucket exchange whose fold
    rolls up per-(part, month), joins each part's base row INSIDE the
    bucket (co-partitioned by construction), and emits per-month sum
    partials — the driver fold is month-grid-sized and does the single
    10000·num // den division in arbitrary-precision Python ints."""
    ds = _read(sf_dir, "lineitem",
               columns=["l_partkey", "l_shipdate", "l_extendedprice",
                        "l_quantity"])

    def minmonth(t: pa.Table) -> pa.Table:
        m = t.column("l_shipdate").to_numpy().astype("datetime64[M]") \
            .astype(np.int64)
        return pa.table({"mn": pa.array([int(m.min())])})

    base_m = int(ds.map_batches(minmonth, batch_format="pyarrow")
                 .to_pandas()["mn"].min())

    def derive(t: pa.Table) -> pa.Table:
        k = t.column("l_partkey").to_numpy().astype(np.int64)
        m = t.column("l_shipdate").to_numpy().astype("datetime64[M]") \
            .astype(np.int64)
        rev = np.floor(t.column("l_extendedprice").to_numpy() * 100) \
            .astype(np.int64)
        q = t.column("l_quantity").to_numpy().astype(np.int64)
        return pa.table({"k": pa.array(k), "m": pa.array(m),
                         "rev": pa.array(rev), "q": pa.array(q),
                         "bucket": pa.array((k % 64).astype(np.int32))})

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        pack = g["k"].to_numpy(np.int64) * (1 << 20) + g["m"].to_numpy(
            np.int64)
        uniq, inv = np.unique(pack, return_inverse=True)
        rev = np.bincount(inv, weights=g["rev"].to_numpy(np.int64)) \
            .astype(np.int64)
        q = np.bincount(inv, weights=g["q"].to_numpy(np.int64)) \
            .astype(np.int64)
        k, m = uniq >> 20, uniq & ((1 << 20) - 1)
        isb = m == base_m
        bk, brev, bq = k[isb], rev[isb], q[isb]
        # join each later row to its part's base row inside the bucket
        pos = np.searchsorted(bk, k)
        pos_c = np.minimum(pos, max(len(bk) - 1, 0))
        matched = (m > base_m) & (len(bk) > 0)
        if len(bk):
            matched &= bk[pos_c] == k
        if not matched.any():
            return pd.DataFrame({
                "m": np.empty(0, np.int64), "n_parts": [], "numL": [],
                "denL": [], "numP": [], "denP": []}).astype("int64")
        mm = m[matched]
        rv, qq = rev[matched], q[matched]
        r0, q0 = brev[pos_c[matched]], bq[pos_c[matched]]
        numL = rv * q0 // qq
        denP = r0 * qq // q0
        months = np.unique(mm)
        mi = np.searchsorted(months, mm)

        def agg(v):
            return np.bincount(mi, weights=v, minlength=len(months)) \
                .astype(np.int64)

        return pd.DataFrame({
            "m": months, "n_parts": np.bincount(mi, minlength=len(months))
            .astype(np.int64), "numL": agg(numL), "denL": agg(r0),
            "numP": agg(rv), "denP": agg(denP)})

    parts = (ds.map_batches(derive, batch_format="pyarrow")
             .groupby("bucket").map_groups(fold, batch_format="pandas")
             .to_pandas())
    agg = (parts.groupby("m", as_index=False).sum()
           .sort_values("m", kind="mergesort").reset_index(drop=True))
    las = [10_000 * int(n) // int(d)
           for n, d in zip(agg["numL"], agg["denL"])]
    paa = [10_000 * int(n) // int(d)
           for n, d in zip(agg["numP"], agg["denP"])]
    return pd.DataFrame({
        "month_index": agg["m"], "n_parts": agg["n_parts"],
        "laspeyres_bps": np.array(las, dtype=np.int64),
        "paasche_bps": np.array(paa, dtype=np.int64)}).astype("int64")


def lineitem_pchart(sf_dir: str) -> pd.DataFrame:
    """Statistical-process-control p-chart over the daily returned-line
    share: a day breaches when its share sits more than 3 binomial
    sigmas from the global rate — the classic data-quality tripwire for
    'did returns spike today'. The 3σ test never touches floats: with
    global totals (P, N) and daily (x, n), breach ⇔
    ``(x·N − n·P)² > 9·n·P·(N−P)`` — one cross-multiplied integer
    compare, evaluated in arbitrary-precision Python ints on the driver
    and in HUGEINT by the SQL twin. Partials are per-block (day, n, x)
    counts from one np.unique — ZERO shuffle; the driver fold is
    day-grid-sized at any data scale."""
    ds = _read(sf_dir, "lineitem", columns=["l_shipdate", "l_returnflag"])

    def partial(t: pa.Table) -> pa.Table:
        d = t.column("l_shipdate").cast(pa.int64()).to_numpy() \
            // 86_400_000_000
        r = (np.asarray(t.column("l_returnflag")) == "R")
        days, inv = np.unique(d, return_inverse=True)
        return pa.table({
            "day": pa.array(days),
            "n": pa.array(np.bincount(inv, minlength=len(days))
                          .astype(np.int64)),
            "x": pa.array(np.bincount(inv, weights=r, minlength=len(days))
                          .astype(np.int64))})

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    agg = (parts.groupby("day", as_index=False).sum()
           .sort_values("day", kind="mergesort").reset_index(drop=True))
    n = agg["n"].to_numpy(np.int64)
    x = agg["x"].to_numpy(np.int64)
    N, P = int(n.sum()), int(x.sum())
    flag = []
    for xi, ni in zip(x, n):
        d = int(xi) * N - int(ni) * P
        if d * d > 9 * int(ni) * P * (N - P):
            flag.append(1 if d > 0 else -1)
        else:
            flag.append(0)
    return pd.DataFrame({
        "day_index": agg["day"], "n_lines": n, "n_returned": x,
        "share_bps": 10_000 * x // n,
        "sigma3_flag": np.array(flag, dtype=np.int64)}).astype("int64")


def cohort_ltv_curve(sf_dir: str) -> pd.DataFrame:
    """Cohort LIFETIME-VALUE curves: customers are cohorted by their
    first order month and each cohort's CUMULATIVE revenue is tracked
    by month offset — the complement of the retention-count triangle
    (``orders_retention_cohort``) that answers 'how much is a cohort
    worth by age k', in exact cents. One ``customer % 64`` bucket
    exchange; the fold finds each customer's cohort via lexsort firsts,
    rolls revenue up to (cohort, offset) and attaches the cohort-size
    partial to the offset-0 row (which always exists — a customer's
    first month IS offset 0); the driver fold runs on the
    cohorts × offsets grid (months², data-scale-free) and does the
    zero-filled cumsum there."""
    ds = _read(sf_dir, "orders",
               columns=["o_custkey", "o_orderdate", "o_totalprice"])

    def derive(t: pa.Table) -> pa.Table:
        c = t.column("o_custkey").to_numpy().astype(np.int64)
        m = t.column("o_orderdate").to_numpy().astype("datetime64[M]") \
            .astype(np.int64)
        rev = np.floor(t.column("o_totalprice").to_numpy() * 100) \
            .astype(np.int64)
        return pa.table({"c": pa.array(c), "m": pa.array(m),
                         "rev": pa.array(rev),
                         "bucket": pa.array((c % 64).astype(np.int32))})

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        c = g["c"].to_numpy(np.int64)
        m = g["m"].to_numpy(np.int64)
        rev = g["rev"].to_numpy(np.int64)
        order = np.lexsort((m, c))
        cs, ms = c[order], m[order]
        starts = np.flatnonzero(np.r_[True, cs[1:] != cs[:-1]])
        m0_per_cust = ms[starts]  # first month per customer
        cust_ids = cs[starts]
        m0 = m0_per_cust[np.searchsorted(cust_ids, c)]
        off = m - m0
        pack = m0 * (1 << 20) + off
        uniq, inv = np.unique(pack, return_inverse=True)
        revs = np.bincount(inv, weights=rev, minlength=len(uniq)) \
            .astype(np.int64)
        co, of = uniq >> 20, uniq & ((1 << 20) - 1)
        ncust = np.zeros(len(uniq), dtype=np.int64)
        cm0, ccnt = np.unique(m0_per_cust, return_counts=True)
        zero_rows = np.searchsorted(uniq, cm0 * (1 << 20))
        ncust[zero_rows] = ccnt
        return pd.DataFrame({"m0": co, "off": of, "rev": revs,
                             "ncust": ncust})

    parts = (ds.map_batches(derive, batch_format="pyarrow")
             .groupby("bucket").map_groups(fold, batch_format="pandas")
             .to_pandas())
    agg = parts.groupby(["m0", "off"], as_index=False).sum()
    mx = int((agg["m0"] + agg["off"]).max())
    rows = []
    for m0, grp in agg.groupby("m0"):
        span = mx - int(m0) + 1
        rev = np.zeros(span, dtype=np.int64)
        rev[grp["off"].to_numpy(np.int64)] = grp["rev"].to_numpy(np.int64)
        rows.append(pd.DataFrame({
            "cohort_month": np.full(span, int(m0), dtype=np.int64),
            "month_offset": np.arange(span, dtype=np.int64),
            "n_customers": np.full(span, int(grp["ncust"].sum()),
                                   dtype=np.int64),
            "cum_rev_cents": rev.cumsum()}))
    return pd.concat(rows, ignore_index=True).astype("int64")


def events_drift_tv(sf_dir: str) -> pd.DataFrame:
    """Distribution-drift monitor: per event type, the TOTAL-VARIATION
    distance (in basis points) between the value distributions of the
    first and second halves of the observation window — the exact,
    bin-free-denominator alternative to PSI/KL that needs no logarithm
    and so stays in integer arithmetic end to end:
    ``tv_bps = 10000·Σ|aᵢ·B − bᵢ·A| // (2·A·B)`` over 10-unit value
    bins. Pass 1 is a 1-row-per-block (min, max) day fold; pass 2 emits
    per-block (type, half, bin, count) partials from one np.unique —
    ZERO shuffle, and the driver fold is (types × bins)-sized in
    arbitrary-precision Python ints."""
    ds = _read(sf_dir, "events", columns=["event_type", "ts", "value"])

    def minmax(t: pa.Table) -> pa.Table:
        d = t.column("ts").cast(pa.int64()).to_numpy() // 86_400_000_000
        return pa.table({"mn": pa.array([int(d.min())]),
                         "mx": pa.array([int(d.max())])})

    mm = ds.map_batches(minmax, batch_format="pyarrow").to_pandas()
    mid = (int(mm["mn"].min()) + int(mm["mx"].max()) + 1) // 2

    def partial(t: pa.Table) -> pa.Table:
        et = np.asarray(t.column("event_type")).astype(object)
        d = t.column("ts").cast(pa.int64()).to_numpy() // 86_400_000_000
        bins = np.floor(t.column("value").to_numpy() * 100) \
            .astype(np.int64) // 1000
        half = (d >= mid).astype(np.int64)
        types, o_half, o_bin, o_n = [], [], [], []
        for ty in np.unique(et):
            msk = et == ty
            pack = half[msk] * (1 << 40) + bins[msk]
            u, cnt = np.unique(pack, return_counts=True)
            types.extend([str(ty)] * len(u))
            o_half.append(u >> 40)
            o_bin.append(u & ((1 << 40) - 1))
            o_n.append(cnt)
        return pa.table({
            "event_type": pa.array(types, type=pa.string()),
            "half": pa.array(np.concatenate(o_half).astype(np.int64)),
            "bin": pa.array(np.concatenate(o_bin).astype(np.int64)),
            "n": pa.array(np.concatenate(o_n).astype(np.int64))})

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    agg = parts.groupby(["event_type", "half", "bin"], as_index=False) \
        .sum()
    out = []
    for ty, grp in agg.groupby("event_type"):
        piv = grp.pivot_table(index="bin", columns="half", values="n",
                              fill_value=0, aggfunc="sum")
        a = piv[0].to_numpy(np.int64) if 0 in piv.columns \
            else np.zeros(len(piv), np.int64)
        b = piv[1].to_numpy(np.int64) if 1 in piv.columns \
            else np.zeros(len(piv), np.int64)
        A, B = int(a.sum()), int(b.sum())
        num = sum(abs(int(ai) * B - int(bi) * A) for ai, bi in zip(a, b))
        out.append((str(ty), A, B, 10_000 * num // (2 * A * B)))
    out.sort()
    return pd.DataFrame(out, columns=["event_type", "n_first",
                                      "n_second", "tv_bps"]) \
        .astype({"n_first": "int64", "n_second": "int64",
                 "tv_bps": "int64"})


def lineitem_ols2(sf_dir: str) -> pd.DataFrame:
    """TWO-feature ordinary least squares — price ~ quantity +
    discount_pct — solved EXACTLY: the nine raw moments (n, Σx₁, Σx₂,
    Σx₁², Σx₁x₂, Σx₂², Σy, Σx₁y, Σx₂y) are integer per-block partials
    (ONE row per block, zero shuffle — the moments ARE the sufficient
    statistic, which is why OLS distributes perfectly), and the driver
    solves the 3×3 normal equations by Cramer determinants in
    arbitrary-precision Python ints. Coefficients are emitted in
    sign-normalized fixed point ``sign · (10⁶·|det_j| // |det|)`` —
    toward-zero truncation matching DuckDB's `//` exactly (never a
    float, never a floor/trunc mismatch on negatives). Units: y in
    whole dollars, x₂ in whole discount percent, keeping every
    determinant far inside HUGEINT for the SQL twin."""
    ds = _read(sf_dir, "lineitem",
               columns=["l_quantity", "l_discount", "l_extendedprice"])

    def partial(t: pa.Table) -> pa.Table:
        x1 = t.column("l_quantity").to_numpy().astype(np.int64)
        x2 = np.floor(t.column("l_discount").to_numpy() * 100) \
            .astype(np.int64)
        y = np.floor(t.column("l_extendedprice").to_numpy()) \
            .astype(np.int64)
        return pa.table({k: pa.array([int(v)]) for k, v in {
            "n": len(x1), "s1": x1.sum(), "s2": x2.sum(),
            "s11": (x1 * x1).sum(), "s12": (x1 * x2).sum(),
            "s22": (x2 * x2).sum(), "sy": y.sum(),
            "s1y": (x1 * y).sum(), "s2y": (x2 * y).sum()}.items()})

    m = ds.map_batches(partial, batch_format="pyarrow").to_pandas().sum()
    n, s1, s2 = int(m["n"]), int(m["s1"]), int(m["s2"])
    s11, s12, s22 = int(m["s11"]), int(m["s12"]), int(m["s22"])
    sy, s1y, s2y = int(m["sy"]), int(m["s1y"]), int(m["s2y"])

    def det3(a):
        return (a[0][0] * (a[1][1] * a[2][2] - a[1][2] * a[2][1])
                - a[0][1] * (a[1][0] * a[2][2] - a[1][2] * a[2][0])
                + a[0][2] * (a[1][0] * a[2][1] - a[1][1] * a[2][0]))

    A = [[n, s1, s2], [s1, s11, s12], [s2, s12, s22]]
    b = [sy, s1y, s2y]
    det = det3(A)
    out = []
    for j, name in enumerate(["intercept", "qty", "disc_pct"]):
        Aj = [row[:] for row in A]
        for r in range(3):
            Aj[r][j] = b[r]
        num = det3(Aj)
        sgn = -1 if (num < 0) != (det < 0) else 1
        out.append((name, sgn * ((10**6 * abs(num)) // abs(det))))
    return pd.DataFrame(out, columns=["coef", "value_micro"]) \
        .astype({"value_micro": "int64"})


def session_step_transitions(sf_dir: str, gap_us: int = 1_800_000_000,
                             max_step: int = 8) -> pd.DataFrame:
    """WHERE in the session do users do what: transition counts
    (from_type → to_type) broken out by the transition's STEP INDEX
    within the session — the position-aware refinement of the global
    Markov matrix (``event_transitions``) that shows e.g. purchases
    concentrating at step 3+. One ``user % 64`` bucket exchange; the
    fold sessionizes via vectorized gap breaks, derives each row's step
    as ``i − session_start(i)`` from a running maximum over break
    indices (no per-session loop), and bin-counts packed
    (step, from, to) codes; output is (steps × types²)-bounded."""
    ds = _read(sf_dir, "events",
               columns=["user_id", "ts", "event_id", "event_type"])

    def derive(t: pa.Table) -> pa.Table:
        u = t.column("user_id").to_numpy().astype(np.int64)
        return pa.table({
            "u": pa.array(u), "ts_us": t.column("ts").cast(pa.int64()),
            "event_id": t.column("event_id"),
            "ty": t.column("event_type"),
            "bucket": pa.array((u % 64).astype(np.int32))})

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        u = g["u"].to_numpy(np.int64)
        ts = g["ts_us"].to_numpy(np.int64)
        e = g["event_id"].to_numpy(np.int64)
        order = np.lexsort((e, ts, u))
        us, tss = u[order], ts[order]
        ty, codes = pd.factorize(g["ty"].to_numpy(object)[order])
        nrow = len(us)
        brk = np.ones(nrow, dtype=bool)
        brk[1:] = (us[1:] != us[:-1]) | (tss[1:] - tss[:-1] > gap_us)
        sess_start = np.maximum.accumulate(
            np.where(brk, np.arange(nrow), 0))
        step = np.arange(nrow) - sess_start - 1  # transition index
        keep = (~brk) & (step < max_step)
        frm = ty[np.flatnonzero(keep) - 1]
        to = ty[keep]
        k = len(codes)
        pack = step[keep] * k * k + frm * k + to
        uniq, cnt = np.unique(pack, return_counts=True)
        return pd.DataFrame({
            "step": uniq // (k * k),
            "from_type": codes[(uniq // k) % k].astype(object),
            "to_type": codes[uniq % k].astype(object),
            "n": cnt.astype(np.int64)})

    parts = (ds.map_batches(derive, batch_format="pyarrow")
             .groupby("bucket").map_groups(fold, batch_format="pandas")
             .to_pandas())
    return (parts.groupby(["step", "from_type", "to_type"],
                          as_index=False)["n"].sum()
            .sort_values(["step", "from_type", "to_type"],
                         kind="mergesort")
            .reset_index(drop=True)
            .astype({"step": "int64", "n": "int64"}))


def events_quiet_windows(sf_dir: str, topk: int = 10) -> pd.DataFrame:
    """Outage/quiet-period audit: the top-k LONGEST gaps between
    consecutive globally-active minutes — 'when did the firehose go
    silent, and for how long'. Per-block partials are the block's
    DISTINCT active minutes (already deduped, so what flows is bounded
    by the calendar-minute grid, never by row count); the driver unions
    them, diffs the sorted grid and ranks gaps under the deterministic
    (gap desc, start asc) tie order — ZERO shuffle at any data scale."""
    ds = _read(sf_dir, "events", columns=["ts"])

    def partial(t: pa.Table) -> pa.Table:
        mi = np.unique(t.column("ts").cast(pa.int64()).to_numpy()
                       // 60_000_000)
        return pa.table({"mi": pa.array(mi)})

    mins = np.unique(
        ds.map_batches(partial, batch_format="pyarrow")
        .to_pandas()["mi"].to_numpy(np.int64))
    gaps = np.diff(mins)
    order = np.lexsort((mins[:-1], -gaps))[:topk]
    return pd.DataFrame({
        "rk": np.arange(1, len(order) + 1, dtype=np.int64),
        "last_active_minute": mins[:-1][order],
        "next_active_minute": mins[1:][order],
        "gap_minutes": gaps[order]}).astype("int64")


def events_interarrival_fano(sf_dir: str) -> pd.DataFrame:
    """Burstiness audit: the FANO FACTOR (variance-to-mean ratio of
    per-minute event counts over the full calendar-minute grid) per
    event type — 1.0 for a Poisson stream, >1 for bursty arrivals; the
    number capacity models need. Exactly integer end to end:
    ``fano_micro = 10⁶·(G·Q − S²) // (G·S)`` with G the grid size, S
    the event count and Q the sum of squared per-minute counts —
    nonnegative by Cauchy–Schwarz, so the truncating division agrees
    on both sides. Q needs per-minute totals merged across blocks, so
    there is ONE ``minute % 64`` bucket exchange (calendar-grid-bounded
    rows, never event-bounded); the grid bounds come from the same
    partials — no second pass."""
    ds = _read(sf_dir, "events", columns=["event_type", "ts"])

    def derive(t: pa.Table) -> pa.Table:
        et = np.asarray(t.column("event_type")).astype(object)
        mi = t.column("ts").cast(pa.int64()).to_numpy() // 60_000_000
        types, o_mi, o_n = [], [], []
        for ty in np.unique(et):
            m = et == ty
            u, c = np.unique(mi[m], return_counts=True)
            types.extend([str(ty)] * len(u))
            o_mi.append(u)
            o_n.append(c)
        mi_all = np.concatenate(o_mi)
        return pa.table({
            "ty": pa.array(types, type=pa.string()),
            "mi": pa.array(mi_all),
            "c": pa.array(np.concatenate(o_n).astype(np.int64)),
            "bucket": pa.array((mi_all % 64).astype(np.int32))})

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        ty, codes = pd.factorize(g["ty"].to_numpy(object))
        mi = g["mi"].to_numpy(np.int64)
        c = g["c"].to_numpy(np.int64)
        k = len(codes)
        pack = mi * k + ty
        uniq, inv = np.unique(pack, return_inverse=True)
        tot = np.bincount(inv, weights=c, minlength=len(uniq)) \
            .astype(np.int64)
        tyu = (uniq % k).astype(np.int64)
        res = pd.DataFrame({
            "ty": codes.take(tyu).astype(object),
            "s": np.bincount(tyu, weights=tot, minlength=k)
            .astype(np.int64)[tyu],
            "q": np.bincount(tyu, weights=tot * tot, minlength=k)
            .astype(np.int64)[tyu]}).drop_duplicates("ty")
        res["mn"] = mi.min()
        res["mx"] = mi.max()
        return res

    parts = (ds.map_batches(derive, batch_format="pyarrow")
             .groupby("bucket").map_groups(fold, batch_format="pandas")
             .to_pandas())
    mn, mx = int(parts["mn"].min()), int(parts["mx"].max())
    grid = mx - mn + 1
    agg = parts.groupby("ty", as_index=False).agg(
        s=("s", "sum"), q=("q", "sum"))
    rows = []
    for _, r in agg.iterrows():
        S, Q = int(r["s"]), int(r["q"])
        rows.append((str(r["ty"]), grid, S, 1000 * S // grid,
                     10**6 * (grid * Q - S * S) // (grid * S)))
    rows.sort()
    return pd.DataFrame(rows, columns=[
        "event_type", "n_minutes", "n_events", "mean_milli",
        "fano_micro"]).astype({
            "n_minutes": "int64", "n_events": "int64",
            "mean_milli": "int64", "fano_micro": "int64"})


def embedding_label_centroids(sf_dir: str) -> pd.DataFrame:
    """Per-LABEL centroid of the embedding column in exact 1e-6 fixed
    point — the supervised-signal audit (are class centroids separated,
    did a label's centroid drift after a data refresh). Each block
    emits one (label, n, packed-dim-sum) partial per label present
    (labels × blocks rows, ZERO shuffle — the same gradient-all-reduce
    shape as ``embedding_dim_stats``); the driver folds and divides
    sign-normalized (toward zero, matching DuckDB ``//`` on the
    negative coordinates). Arrow list values flatten zero-copy."""
    ds = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet",
                               columns=["embedding", "label"])

    def partial(t: pa.Table) -> pa.Table:
        arr = t.column("embedding").combine_chunks()
        flat = arr.flatten().to_numpy(zero_copy_only=False)
        lab = t.column("label").to_numpy().astype(np.int64)
        dim = len(flat) // len(arr)
        fp = np.floor(flat.astype(np.float64) * 1_000_000.0) \
            .astype(np.int64).reshape(-1, dim)
        labs, o_n, o_s = [], [], []
        for lb in np.unique(lab):
            m = lab == lb
            labs.append(int(lb))
            o_n.append(int(m.sum()))
            o_s.append(fp[m].sum(axis=0).tobytes())
        return pa.table({
            "label": pa.array(labs, type=pa.int64()),
            "n": pa.array(o_n, type=pa.int64()),
            "s": pa.array(o_s, type=pa.large_binary())})

    rows = ds.map_batches(partial, batch_format="pyarrow").take_all()
    acc: dict[int, list] = {}
    for r in rows:
        s = np.frombuffer(r["s"], dtype=np.int64)
        if r["label"] in acc:
            acc[r["label"]][0] += int(r["n"])
            acc[r["label"]][1] = acc[r["label"]][1] + s
        else:
            acc[r["label"]] = [int(r["n"]), s.copy()]
    out_lab, out_dim, out_n, out_c = [], [], [], []
    for lb in sorted(acc):
        n, s = acc[lb]
        d = len(s)
        out_lab.append(np.full(d, lb, dtype=np.int64))
        out_dim.append(np.arange(1, d + 1, dtype=np.int64))
        out_n.append(np.full(d, n, dtype=np.int64))
        mag = np.abs(s) // n
        out_c.append(np.where(s < 0, -mag, mag))
    return pd.DataFrame({
        "label": np.concatenate(out_lab),
        "dim": np.concatenate(out_dim),
        "n_vecs": np.concatenate(out_n),
        "centroid_micro": np.concatenate(out_c)}).astype("int64")


def lineitem_price_surface(sf_dir: str) -> pd.DataFrame:
    """Price interaction surface: mean extended price (exact cents,
    truncating mean) per (discount %, tax %) cell — the 2-D readout
    that shows whether discounts and tax bands interact in pricing.
    Cells are a ≤ 11×9 grid, so each block emits one fixed-size packed
    bincount partial — ZERO shuffle, driver fold is grid-sized."""
    ds = _read(sf_dir, "lineitem",
               columns=["l_discount", "l_tax", "l_extendedprice"])

    def partial(t: pa.Table) -> pa.Table:
        d = np.floor(t.column("l_discount").to_numpy() * 100) \
            .astype(np.int64)
        x = np.floor(t.column("l_tax").to_numpy() * 100).astype(np.int64)
        cents = np.floor(t.column("l_extendedprice").to_numpy() * 100) \
            .astype(np.int64)
        cell = d * 16 + x
        size = 16 * 16
        return pa.table({
            "n": pa.array([np.bincount(cell, minlength=size)
                           .astype(np.int64).tobytes()],
                          type=pa.large_binary()),
            "s": pa.array([np.bincount(cell, weights=cents,
                                       minlength=size)
                           .astype(np.int64).tobytes()],
                          type=pa.large_binary())})

    rows = ds.map_batches(partial, batch_format="pyarrow").take_all()
    n = np.sum([np.frombuffer(r["n"], dtype=np.int64) for r in rows],
               axis=0).astype(np.int64)
    s = np.sum([np.frombuffer(r["s"], dtype=np.int64) for r in rows],
               axis=0).astype(np.int64)
    keep = np.flatnonzero(n > 0)
    return pd.DataFrame({
        "disc_pct": keep // 16, "tax_pct": keep % 16,
        "n_lines": n[keep], "mean_price_cents": s[keep] // n[keep],
        "sum_price_cents": s[keep]}).astype("int64")


def user_retention_triangle(sf_dir: str) -> pd.DataFrame:
    """The classic cohort RETENTION TRIANGLE: users cohorted by first
    active week, and for each (cohort, week offset) the count of
    cohort members active that week — the cohort-resolved complement
    of the global ``user_growth_accounting`` waterfall. Weeks are pure
    integer epoch-day // 7 (no calendar library on either side). One
    ``user % 64`` bucket exchange; the fold dedupes (user, week) pairs
    by lexsort, takes cohorts from segment firsts and bin-counts
    packed (cohort, offset) codes — what flows per bucket is
    weeks²-bounded, never event- or user-bounded."""
    ds = _read(sf_dir, "events", columns=["user_id", "ts"])

    def derive(t: pa.Table) -> pa.Table:
        u = t.column("user_id").to_numpy().astype(np.int64)
        w = (t.column("ts").cast(pa.int64()).to_numpy()
             // 86_400_000_000) // 7
        return pa.table({"u": pa.array(u), "w": pa.array(w),
                         "bucket": pa.array((u % 64).astype(np.int32))})

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        u = g["u"].to_numpy(np.int64)
        w = g["w"].to_numpy(np.int64)
        pair = np.unique(u * (1 << 20) + w)
        uu, ww = pair >> 20, pair & ((1 << 20) - 1)
        starts = np.flatnonzero(np.r_[True, uu[1:] != uu[:-1]])
        w0 = ww[starts]  # cohort week per user (pairs sorted by u, w)
        cohort = np.repeat(w0, np.diff(np.r_[starts, len(uu)]))
        pack = cohort * (1 << 20) + (ww - cohort)
        uniq, cnt = np.unique(pack, return_counts=True)
        return pd.DataFrame({"cohort": uniq >> 20,
                             "off": uniq & ((1 << 20) - 1),
                             "n": cnt.astype(np.int64)})

    parts = (ds.map_batches(derive, batch_format="pyarrow")
             .groupby("bucket").map_groups(fold, batch_format="pandas")
             .to_pandas())
    return (parts.groupby(["cohort", "off"], as_index=False)["n"].sum()
            .sort_values(["cohort", "off"], kind="mergesort")
            .reset_index(drop=True)
            .rename(columns={"cohort": "cohort_week",
                             "off": "week_offset", "n": "n_active"})
            .astype("int64"))


def embedding_label_margin(sf_dir: str) -> pd.DataFrame:
    """Class-separability audit: squared L2 distance between every
    pair of LABEL CENTROIDS in the fixed-point (1e-6) coordinate
    system — the margin matrix that says whether labels are actually
    separated before anyone trains on them. Centroids come from the
    same zero-shuffle binary-packed partials as
    ``embedding_label_centroids``; distances are computed on the
    driver over the (labels × labels) grid from the already-divided
    integer centroids, so both sides square identical ints."""
    cent = embedding_label_centroids(sf_dir)
    labs = cent["label"].unique()
    d = int(cent["dim"].max())
    mat = (cent.sort_values(["label", "dim"])["centroid_micro"]
           .to_numpy(np.int64).reshape(len(labs), d))
    rows = []
    for i in range(len(labs)):
        for j in range(i + 1, len(labs)):
            diff = mat[i] - mat[j]
            rows.append((int(labs[i]), int(labs[j]),
                         int((diff * diff).sum())))
    return pd.DataFrame(rows, columns=["label_a", "label_b",
                                       "dist2_micro2"]) \
        .astype("int64")


def part_price_ols_by_brand(sf_dir: str) -> pd.DataFrame:
    """GROUPED simple regression: per brand, the OLS slope and
    intercept of retail price (cents) against part size — 'does this
    brand charge for size' — in exact sign-normalized fixed point. The
    five raw moments per brand are per-block partials (brands ×
    blocks rows, ZERO shuffle); the driver solves the closed form in
    arbitrary-precision ints with toward-zero division matching DuckDB
    ``//`` on negative numerators."""
    ds = _read(sf_dir, "part",
               columns=["p_brand", "p_size", "p_retailprice"])

    def partial(t: pa.Table) -> pa.Table:
        br = np.asarray(t.column("p_brand")).astype(object)
        x = t.column("p_size").to_numpy().astype(np.int64)
        y = np.floor(t.column("p_retailprice").to_numpy() * 100) \
            .astype(np.int64)
        code, uniq = pd.factorize(br)
        k = len(uniq)
        return pa.table({
            "brand": pa.array(uniq.astype(str), type=pa.string()),
            "n": pa.array(np.bincount(code, minlength=k)
                          .astype(np.int64)),
            "sx": pa.array(np.bincount(code, weights=x, minlength=k)
                           .astype(np.int64)),
            "sxx": pa.array(np.bincount(code, weights=x * x,
                                        minlength=k).astype(np.int64)),
            "sy": pa.array(np.bincount(code, weights=y, minlength=k)
                           .astype(np.int64)),
            "sxy": pa.array(np.bincount(code, weights=x * y,
                                        minlength=k).astype(np.int64))})

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    agg = parts.groupby("brand", as_index=False).sum()

    def sdiv(num: int, den: int, scale: int = 10**6) -> int:
        sgn = -1 if (num < 0) != (den < 0) else 1
        return sgn * ((scale * abs(num)) // abs(den))

    rows = []
    for _, r in agg.iterrows():
        n, sx, sxx = int(r["n"]), int(r["sx"]), int(r["sxx"])
        sy, sxy = int(r["sy"]), int(r["sxy"])
        den = n * sxx - sx * sx
        if den == 0:  # degenerate stratum (constant size); twin skips too
            continue
        rows.append((str(r["brand"]), n,
                     sdiv(n * sxy - sx * sy, den),
                     sdiv(sy * sxx - sx * sxy, den)))
    rows.sort()
    return pd.DataFrame(rows, columns=[
        "brand", "n_parts", "slope_micro", "intercept_micro"]) \
        .astype({"n_parts": "int64", "slope_micro": "int64",
                 "intercept_micro": "int64"})


def session_length_hist(sf_dir: str, gap_us: int = 1_800_000_000,
                        cap: int = 20) -> pd.DataFrame:
    """Session SHAPE distribution: how many sessions have 1, 2, …,
    20+ events, and the total wall duration at each length — the full
    histogram behind the single-number ``session_bounce_rate``. One
    ``user % 64`` bucket exchange; the fold sessionizes by vectorized
    gap breaks and reduces per-session (count, duration) via segment
    boundaries — partials are ≤ ``cap`` rows per bucket."""
    ds = _read(sf_dir, "events", columns=["user_id", "ts", "event_id"])

    def derive(t: pa.Table) -> pa.Table:
        u = t.column("user_id").to_numpy().astype(np.int64)
        return pa.table({
            "u": pa.array(u), "ts_us": t.column("ts").cast(pa.int64()),
            "event_id": t.column("event_id"),
            "bucket": pa.array((u % 64).astype(np.int32))})

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        u = g["u"].to_numpy(np.int64)
        ts = g["ts_us"].to_numpy(np.int64)
        e = g["event_id"].to_numpy(np.int64)
        order = np.lexsort((e, ts, u))
        us, tss = u[order], ts[order]
        brk = np.ones(len(us), dtype=bool)
        brk[1:] = (us[1:] != us[:-1]) | (tss[1:] - tss[:-1] > gap_us)
        starts = np.flatnonzero(brk)
        ends = np.r_[starts[1:], len(us)]
        cnt = ends - starts
        dur = tss[ends - 1] - tss[starts]
        lb = np.minimum(cnt, cap)
        return pd.DataFrame({
            "len_bucket": np.arange(1, cap + 1, dtype=np.int64),
            "n_sessions": np.bincount(lb, minlength=cap + 1)[1:]
            .astype(np.int64),
            "sum_duration_us": np.bincount(lb, weights=dur,
                                           minlength=cap + 1)[1:]
            .astype(np.int64)})

    parts = (ds.map_batches(derive, batch_format="pyarrow")
             .groupby("bucket").map_groups(fold, batch_format="pandas")
             .to_pandas())
    out = (parts.groupby("len_bucket", as_index=False).sum()
           .sort_values("len_bucket", kind="mergesort")
           .reset_index(drop=True))
    return out[out["n_sessions"] > 0].reset_index(drop=True) \
        .astype("int64")


def days_to_first_purchase(sf_dir: str) -> pd.DataFrame:
    """Funnel latency distribution: for every converting user, the
    days between their FIRST event and their FIRST purchase — the
    time-to-value histogram growth teams watch. One ``user % 64``
    bucket exchange; the fold takes both firsts in a single lexsort
    pass (the purchase first via a +inf-masked segment minimum — no
    second sort) and emits per-gap-day count partials, so the driver
    fold is gap-grid-sized."""
    ds = _read(sf_dir, "events", columns=["user_id", "ts", "event_type"])

    def derive(t: pa.Table) -> pa.Table:
        u = t.column("user_id").to_numpy().astype(np.int64)
        return pa.table({
            "u": pa.array(u), "ts_us": t.column("ts").cast(pa.int64()),
            "isp": pa.array((np.asarray(t.column("event_type"))
                             == "purchase").astype(np.int8)),
            "bucket": pa.array((u % 64).astype(np.int32))})

    BIG = np.int64(2**62)

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        u = g["u"].to_numpy(np.int64)
        ts = g["ts_us"].to_numpy(np.int64)
        isp = g["isp"].to_numpy(np.int8).astype(bool)
        order = np.lexsort((ts, u))
        us, tss, ps = u[order], ts[order], isp[order]
        starts = np.flatnonzero(np.r_[True, us[1:] != us[:-1]])
        f0 = tss[starts] // 86_400_000_000
        masked = np.where(ps, tss, BIG)
        p0 = np.minimum.reduceat(masked, starts)
        conv = p0 < BIG
        gap = p0[conv] // 86_400_000_000 - f0[conv]
        ug, cnt = np.unique(gap, return_counts=True)
        return pd.DataFrame({"gap_days": ug,
                             "n_users": cnt.astype(np.int64)})

    parts = (ds.map_batches(derive, batch_format="pyarrow")
             .groupby("bucket").map_groups(fold, batch_format="pandas")
             .to_pandas())
    return (parts.groupby("gap_days", as_index=False)["n_users"].sum()
            .sort_values("gap_days", kind="mergesort")
            .reset_index(drop=True).astype("int64"))


def user_activity_hist(sf_dir: str, cap: int = 50) -> pd.DataFrame:
    """The user POWER CURVE: how many users produced exactly k events
    (k capped at 50, the long tail lumped) — the engagement-shape
    histogram behind every 'power user' definition. One ``user % 64``
    bucket exchange; per-bucket partials are ≤ ``cap`` rows."""
    ds = _read(sf_dir, "events", columns=["user_id"])

    def derive(t: pa.Table) -> pa.Table:
        u = t.column("user_id").to_numpy().astype(np.int64)
        return pa.table({"u": pa.array(u),
                         "bucket": pa.array((u % 64).astype(np.int32))})

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        _, cnt = np.unique(g["u"].to_numpy(np.int64),
                           return_counts=True)
        lb = np.minimum(cnt, cap)
        return pd.DataFrame({
            "n_events": np.arange(1, cap + 1, dtype=np.int64),
            "n_users": np.bincount(lb, minlength=cap + 1)[1:]
            .astype(np.int64)})

    parts = (ds.map_batches(derive, batch_format="pyarrow")
             .groupby("bucket").map_groups(fold, batch_format="pandas")
             .to_pandas())
    out = (parts.groupby("n_events", as_index=False)["n_users"].sum()
           .sort_values("n_events", kind="mergesort")
           .reset_index(drop=True))
    return out[out["n_users"] > 0].reset_index(drop=True) \
        .astype("int64")


def order_line_count_hist(sf_dir: str, cap: int = 10) -> pd.DataFrame:
    """Order SHAPE histogram: orders by line count (capped), with the
    total revenue at each shape — basket-size distribution for
    fulfilment planning, exact cents. One ``orderkey % 64`` bucket
    exchange; ≤ ``cap`` partial rows per bucket."""
    ds = _read(sf_dir, "lineitem",
               columns=["l_orderkey", "l_extendedprice"])

    def derive(t: pa.Table) -> pa.Table:
        k = t.column("l_orderkey").to_numpy().astype(np.int64)
        rev = np.floor(t.column("l_extendedprice").to_numpy() * 100) \
            .astype(np.int64)
        return pa.table({"k": pa.array(k), "rev": pa.array(rev),
                         "bucket": pa.array((k % 64).astype(np.int32))})

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        k = g["k"].to_numpy(np.int64)
        rev = g["rev"].to_numpy(np.int64)
        uk, inv, cnt = np.unique(k, return_inverse=True,
                                 return_counts=True)
        orev = np.bincount(inv, weights=rev, minlength=len(uk)) \
            .astype(np.int64)
        lb = np.minimum(cnt, cap)
        return pd.DataFrame({
            "n_lines": np.arange(1, cap + 1, dtype=np.int64),
            "n_orders": np.bincount(lb, minlength=cap + 1)[1:]
            .astype(np.int64),
            "revenue_cents": np.bincount(lb, weights=orev,
                                         minlength=cap + 1)[1:]
            .astype(np.int64)})

    parts = (ds.map_batches(derive, batch_format="pyarrow")
             .groupby("bucket").map_groups(fold, batch_format="pandas")
             .to_pandas())
    out = (parts.groupby("n_lines", as_index=False).sum()
           .sort_values("n_lines", kind="mergesort")
           .reset_index(drop=True))
    return out[out["n_orders"] > 0].reset_index(drop=True) \
        .astype("int64")


def orders_changepoint_scan(sf_dir: str, topk: int = 5) -> pd.DataFrame:
    """Binary-segmentation CHANGE-POINT scan over the daily revenue
    series: for every split day k, the between-segment contrast
    ``(S_L·n − S·n_L)² // (n_L·n_R·S)`` — the first step of the classic
    changepoint recursion, ranked to surface the top-k structural
    breaks. The statistic is evaluated in arbitrary-precision Python
    ints (HUGEINT in the twin) and the division truncates identically
    on both sides (numerator squared → nonnegative). Per-block daily
    partials — ZERO shuffle; the scan runs on the zero-filled day grid
    (calendar-bounded at any volume)."""
    ds = _read(sf_dir, "orders", columns=["o_orderdate", "o_totalprice"])

    def partial(t: pa.Table) -> pa.Table:
        dy = t.column("o_orderdate").cast(pa.int64()).to_numpy() \
            // 86_400_000_000
        rev = np.floor(t.column("o_totalprice").to_numpy() * 100) \
            .astype(np.int64)
        u, inv = np.unique(dy, return_inverse=True)
        return pa.table({
            "dy": pa.array(u),
            "rev": pa.array(np.bincount(inv, weights=rev,
                                        minlength=len(u))
                            .astype(np.int64))})

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    agg = parts.groupby("dy", as_index=False)["rev"].sum()
    mn, mx = int(agg["dy"].min()), int(agg["dy"].max())
    grid = np.zeros(mx - mn + 1, dtype=np.int64)
    grid[agg["dy"].to_numpy(np.int64) - mn] = agg["rev"].to_numpy(
        np.int64)
    n = len(grid)
    S = int(grid.sum())
    sl = grid.cumsum()
    scores = []
    for k in range(n - 1):
        n_l = k + 1
        dnum = int(sl[k]) * n - S * n_l
        scores.append(dnum * dnum // (n_l * (n - n_l) * S))
    sc = np.array(scores, dtype=np.int64)
    days = np.arange(mn, mx, dtype=np.int64)
    order = np.lexsort((days, -sc))[:topk]
    return pd.DataFrame({
        "rk": np.arange(1, len(order) + 1, dtype=np.int64),
        "day_index": days[order],
        "n_left_days": days[order] - mn + 1,
        "score": sc[order]}).astype("int64")


def customer_snm_pairs(sf_dir: str, window: int = 5,
                       tol_cents: int = 100) -> pd.DataFrame:
    """SORTED-NEIGHBORHOOD record-linkage blocking (the third blocking
    family next to structured blocking — ``part_substitutes`` — and
    SymSpell — ``name_edit_near_pairs``): customers sorted by account
    balance; candidate pairs are same-segment rows within a window of
    5 positions and ≤ $1 apart — the duplicate-account tripwire.
    Customer is the DIMENSION side, so the sort runs on the driver
    (documented assumption, same as the other dimension finishes; at
    100 TB the fact tables never enter this op) and the window compare
    is ``window`` vectorized shifted comparisons, never a pair loop."""
    ds = _read(sf_dir, "customer",
               columns=["c_custkey", "c_mktsegment", "c_acctbal"])
    df = ds.to_pandas()
    ck = df["c_custkey"].to_numpy(np.int64)
    seg = df["c_mktsegment"].to_numpy(object)
    cents = np.floor(df["c_acctbal"].to_numpy() * 100).astype(np.int64)
    order = np.lexsort((ck, cents))
    seg_s, cents_s = seg[order], cents[order]
    segs, diffs = [], []
    for d in range(1, window + 1):
        same = seg_s[:-d] == seg_s[d:]
        diff = cents_s[d:] - cents_s[:-d]
        keep = same & (diff <= tol_cents)
        segs.append(seg_s[:-d][keep])
        diffs.append(diff[keep])
    seg_all = np.concatenate(segs)
    diff_all = np.concatenate(diffs)
    out = (pd.DataFrame({"mktsegment": seg_all, "diff": diff_all})
           .groupby("mktsegment", as_index=False)
           .agg(n_pairs=("diff", "size"),
                min_diff_cents=("diff", "min")))
    return (out.sort_values("mktsegment", kind="mergesort")
            .reset_index(drop=True)
            .astype({"n_pairs": "int64", "min_diff_cents": "int64"}))


def part_abc_xyz(sf_dir: str) -> pd.DataFrame:
    """The ABC×XYZ inventory matrix: parts classed by revenue Pareto
    position (A ≤80% cumulative share, B ≤95%, else C — same
    cross-multiplied integer rule as ``part_abc``) × demand
    VARIABILITY (X/Y/Z by the CV² of monthly quantity over the global
    month grid: 4·(M·Q−S²) ≤ S² → X, M·Q−S² ≤ S² → Y, else Z — all
    integer, zero-demand months included via the grid size M). One
    ``part % 64`` bucket exchange collapses the fact table to a
    part-cardinality rollup carrying (rev, Σq, Σq²); the Pareto sweep
    runs on the rollup (dimension-sized, the documented driver
    assumption)."""
    ds = _read(sf_dir, "lineitem",
               columns=["l_partkey", "l_shipdate", "l_extendedprice",
                        "l_quantity"])

    def derive(t: pa.Table) -> pa.Table:
        k = t.column("l_partkey").to_numpy().astype(np.int64)
        m = t.column("l_shipdate").to_numpy().astype("datetime64[M]") \
            .astype(np.int64)
        rev = np.floor(t.column("l_extendedprice").to_numpy() * 100) \
            .astype(np.int64)
        q = t.column("l_quantity").to_numpy().astype(np.int64)
        return pa.table({"k": pa.array(k), "m": pa.array(m),
                         "rev": pa.array(rev), "q": pa.array(q),
                         "bucket": pa.array((k % 64).astype(np.int32))})

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        pack = g["k"].to_numpy(np.int64) * (1 << 20) + g["m"].to_numpy(
            np.int64)
        uniq, inv = np.unique(pack, return_inverse=True)
        q = np.bincount(inv, weights=g["q"].to_numpy(np.int64)) \
            .astype(np.int64)
        rev = np.bincount(inv, weights=g["rev"].to_numpy(np.int64)) \
            .astype(np.int64)
        k = uniq >> 20
        m = uniq & ((1 << 20) - 1)
        uk, kinv = np.unique(k, return_inverse=True)
        return pd.DataFrame({
            "k": uk,
            "rev": np.bincount(kinv, weights=rev).astype(np.int64),
            "s": np.bincount(kinv, weights=q).astype(np.int64),
            "qq": np.bincount(kinv, weights=q * q).astype(np.int64),
            "mn": np.full(len(uk), m.min(), dtype=np.int64),
            "mx": np.full(len(uk), m.max(), dtype=np.int64)})

    roll = (ds.map_batches(derive, batch_format="pyarrow")
            .groupby("bucket").map_groups(fold, batch_format="pandas")
            .to_pandas())
    M = int(roll["mx"].max()) - int(roll["mn"].min()) + 1
    k = roll["k"].to_numpy(np.int64)
    rev = roll["rev"].to_numpy(np.int64)
    s = roll["s"].to_numpy(np.int64)
    qq = roll["qq"].to_numpy(np.int64)
    order = np.lexsort((k, -rev))
    cum = rev[order].cumsum()
    tot = int(cum[-1])
    abc = np.where(cum * 5 <= tot * 4, "A",
                   np.where(cum * 20 <= tot * 19, "B", "C"))
    abc_u = np.empty(len(k), dtype=object)
    abc_u[order] = abc
    d = M * qq - s * s
    xyz = np.where(4 * d <= s * s, "X",
                   np.where(d <= s * s, "Y", "Z"))
    out = (pd.DataFrame({"abc": abc_u, "xyz": xyz, "rev": rev})
           .groupby(["abc", "xyz"], as_index=False)
           .agg(n_parts=("rev", "size"), revenue_cents=("rev", "sum")))
    return (out.sort_values(["abc", "xyz"], kind="mergesort")
            .reset_index(drop=True)
            .astype({"n_parts": "int64", "revenue_cents": "int64"}))


def user_burstiness_bands(sf_dir: str) -> pd.DataFrame:
    """Per-user BURSTINESS classification: the CV² of a user's
    inter-event gaps (seconds) against the bands ≤0.25 (metronome),
    ≤1 (Poisson-ish), ≤4 (bursty), >4 (extreme) — all comparisons
    cross-multiplied integers, and Σgaps is bounded by the observation
    SPAN (gaps telescope), so nothing approaches overflow at any
    activity level. One ``user % 64`` bucket exchange; per-bucket
    partials are 4 counter rows."""
    ds = _read(sf_dir, "events", columns=["user_id", "ts", "event_id"])

    def derive(t: pa.Table) -> pa.Table:
        u = t.column("user_id").to_numpy().astype(np.int64)
        return pa.table({
            "u": pa.array(u), "ts_us": t.column("ts").cast(pa.int64()),
            "event_id": t.column("event_id"),
            "bucket": pa.array((u % 64).astype(np.int32))})

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        u = g["u"].to_numpy(np.int64)
        ts = g["ts_us"].to_numpy(np.int64)
        e = g["event_id"].to_numpy(np.int64)
        order = np.lexsort((e, ts, u))
        us, tss = u[order], ts[order]
        gap = (tss[1:] - tss[:-1]) // 1_000_000
        same = us[1:] == us[:-1]
        uid = us[1:][same]
        gp = gap[same]
        uu, inv = np.unique(uid, return_inverse=True)
        n = np.bincount(inv, minlength=len(uu)).astype(np.int64)
        sg = np.bincount(inv, weights=gp, minlength=len(uu)) \
            .astype(np.int64)
        qg = np.bincount(inv, weights=gp * gp, minlength=len(uu)) \
            .astype(np.int64)
        d = n * qg - sg * sg
        band = np.where(4 * d <= sg * sg, 0,
                        np.where(d <= sg * sg, 1,
                                 np.where(d <= 4 * sg * sg, 2, 3)))
        return pd.DataFrame({
            "band": np.arange(4, dtype=np.int64),
            "n_users": np.bincount(band, minlength=4)
            .astype(np.int64)})

    parts = (ds.map_batches(derive, batch_format="pyarrow")
             .groupby("bucket").map_groups(fold, batch_format="pandas")
             .to_pandas())
    out = (parts.groupby("band", as_index=False)["n_users"].sum()
           .sort_values("band", kind="mergesort").reset_index(drop=True))
    return out[out["n_users"] > 0].reset_index(drop=True) \
        .astype("int64")


def lineitem_margin_waterfall(sf_dir: str) -> pd.DataFrame:
    """Money WATERFALL per return flag: gross price → discount given →
    net → tax collected → charged, all exact cents from the same
    left-associated float expressions on both sides (identical float64
    input → identical FLOOR), so
    ``gross − discount = net`` and ``net + tax = charged`` hold
    exactly. Per-block partials are 3 rows (one per flag) — ZERO
    shuffle."""
    ds = _read(sf_dir, "lineitem",
               columns=["l_returnflag", "l_extendedprice", "l_discount",
                        "l_tax"])

    def partial(t: pa.Table) -> pa.Table:
        fl = np.asarray(t.column("l_returnflag")).astype(object)
        ep = t.column("l_extendedprice").to_numpy()
        d = t.column("l_discount").to_numpy()
        tx = t.column("l_tax").to_numpy()
        gross = np.floor(ep * 100).astype(np.int64)
        net = np.floor(ep * (1 - d) * 100).astype(np.int64)
        chg = np.floor(ep * (1 - d) * (1 + tx) * 100).astype(np.int64)
        code, uniq = pd.factorize(fl)
        k = len(uniq)
        return pa.table({
            "returnflag": pa.array(uniq.astype(str), type=pa.string()),
            "gross": pa.array(np.bincount(code, weights=gross,
                                          minlength=k).astype(np.int64)),
            "net": pa.array(np.bincount(code, weights=net, minlength=k)
                            .astype(np.int64)),
            "chg": pa.array(np.bincount(code, weights=chg, minlength=k)
                            .astype(np.int64))})

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    agg = (parts.groupby("returnflag", as_index=False).sum()
           .sort_values("returnflag", kind="mergesort")
           .reset_index(drop=True))
    gross = agg["gross"].to_numpy(np.int64)
    net = agg["net"].to_numpy(np.int64)
    chg = agg["chg"].to_numpy(np.int64)
    return pd.DataFrame({
        "returnflag": agg["returnflag"], "gross_cents": gross,
        "discount_cents": gross - net, "net_cents": net,
        "tax_cents": chg - net, "charged_cents": chg}) \
        .astype({c: "int64" for c in
                 ["gross_cents", "discount_cents", "net_cents",
                  "tax_cents", "charged_cents"]})


def user_type_diversity_hist(sf_dir: str) -> pd.DataFrame:
    """Per-user behavioral DIVERSITY (Gini–Simpson index of the user's
    event-type mix, ``1 − Σpᵢ²`` as the division-free integer
    ``10000·(n² − Σnᵢ²) // n²``) histogrammed into 1000-bps bins — who
    is a one-note user and who roams the product. One ``user % 64``
    bucket exchange; per-bucket partials are ≤ 10 bin-counter rows."""
    ds = _read(sf_dir, "events", columns=["user_id", "event_type"])

    def derive(t: pa.Table) -> pa.Table:
        u = t.column("user_id").to_numpy().astype(np.int64)
        return pa.table({"u": pa.array(u), "ty": t.column("event_type"),
                         "bucket": pa.array((u % 64).astype(np.int32))})

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        u = g["u"].to_numpy(np.int64)
        code, uniq = pd.factorize(g["ty"].to_numpy(object))
        k = len(uniq)
        pack = u * k + code
        _, pinv, pc_ = np.unique(pack, return_inverse=True,
                                 return_counts=True)
        uu, uinv = np.unique(_ // k, return_inverse=True)
        n = np.bincount(uinv, weights=pc_, minlength=len(uu)) \
            .astype(np.int64)
        q = np.bincount(uinv, weights=pc_ * pc_, minlength=len(uu)) \
            .astype(np.int64)
        bps = 10_000 * (n * n - q) // (n * n)
        bins = bps // 250
        return pd.DataFrame({
            "bin": np.arange(40, dtype=np.int64),
            "n_users": np.bincount(bins, minlength=40)
            .astype(np.int64)})

    parts = (ds.map_batches(derive, batch_format="pyarrow")
             .groupby("bucket").map_groups(fold, batch_format="pandas")
             .to_pandas())
    out = (parts.groupby("bin", as_index=False)["n_users"].sum()
           .sort_values("bin", kind="mergesort").reset_index(drop=True))
    return out[out["n_users"] > 0].reset_index(drop=True) \
        .astype("int64")


def orders_monthly_zchart(sf_dir: str) -> pd.DataFrame:
    """The classic Z-CHART: monthly revenue, calendar-year-to-date
    cumulative, and 12-month moving annual total, exact cents on the
    zero-filled month grid — three series managers read off one chart.
    Per-block monthly partials — ZERO shuffle; the cumsum/MAT sweep is
    month-grid-sized on the driver (at 100 TB the grid is still just
    the calendar)."""
    ds = _read(sf_dir, "orders", columns=["o_orderdate", "o_totalprice"])

    def partial(t: pa.Table) -> pa.Table:
        m = t.column("o_orderdate").to_numpy().astype("datetime64[M]") \
            .astype(np.int64)
        rev = np.floor(t.column("o_totalprice").to_numpy() * 100) \
            .astype(np.int64)
        u, inv = np.unique(m, return_inverse=True)
        return pa.table({
            "m": pa.array(u),
            "rev": pa.array(np.bincount(inv, weights=rev,
                                        minlength=len(u))
                            .astype(np.int64))})

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    agg = parts.groupby("m", as_index=False)["rev"].sum()
    mn, mx = int(agg["m"].min()), int(agg["m"].max())
    grid = np.zeros(mx - mn + 1, dtype=np.int64)
    grid[agg["m"].to_numpy(np.int64) - mn] = agg["rev"].to_numpy(
        np.int64)
    mi = np.arange(mn, mx + 1, dtype=np.int64)
    year = mi // 12
    ytd = grid.cumsum()
    # subtract the cumsum just before each year's first month
    ystart = np.flatnonzero(np.r_[True, year[1:] != year[:-1]])
    base = np.repeat(np.r_[0, ytd[ystart[1:] - 1]],
                     np.diff(np.r_[ystart, len(mi)]))
    ytd = ytd - base
    csum = np.r_[0, grid.cumsum()]
    lo = np.maximum(np.arange(len(grid)) - 11, 0)
    mat = csum[np.arange(1, len(grid) + 1)] - csum[lo]
    return pd.DataFrame({
        "month_index": mi, "rev_cents": grid, "ytd_cents": ytd,
        "mat_cents": mat}).astype("int64")


def events_type_share_series(sf_dir: str) -> pd.DataFrame:
    """Composition-over-time series: each event type's monthly share of
    all events in exact basis points — the 100%-stacked-area data that
    shows product mix shifting. Per-block (month, type, n) partials —
    ZERO shuffle; the driver fold is (months × types)-sized."""
    ds = _read(sf_dir, "events", columns=["event_type", "ts"])

    def partial(t: pa.Table) -> pa.Table:
        et = np.asarray(t.column("event_type")).astype(object)
        m = t.column("ts").to_numpy().astype("datetime64[M]") \
            .astype(np.int64)
        code, uniq = pd.factorize(et)
        k = len(uniq)
        pack = m * k + code
        u, c = np.unique(pack, return_counts=True)
        return pa.table({
            "m": pa.array(u // k),
            "ty": pa.array(uniq.take(u % k).astype(str),
                           type=pa.string()),
            "n": pa.array(c.astype(np.int64))})

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    agg = parts.groupby(["m", "ty"], as_index=False)["n"].sum()
    tot = agg.groupby("m")["n"].transform("sum").to_numpy(np.int64)
    agg["share_bps"] = 10_000 * agg["n"].to_numpy(np.int64) // tot
    return (agg.sort_values(["m", "ty"], kind="mergesort")
            .reset_index(drop=True)
            .rename(columns={"m": "month_index", "ty": "event_type",
                             "n": "n_events"})
            .astype({"month_index": "int64", "n_events": "int64",
                     "share_bps": "int64"}))


def brand_type_lift(sf_dir: str) -> pd.DataFrame:
    """Catalog attribute ASSOCIATION: observed/expected lift between
    part brand and part type, ``10⁶·N·n_bt // (n_b·n_t)`` — PMI's
    log-free sibling over the contingency table, exact integers
    (1e6 = independent). Per-block (brand, type, n) partials — ZERO
    shuffle; marginals and lift on the (brands × types) driver grid."""
    ds = _read(sf_dir, "part", columns=["p_brand", "p_type"])

    def partial(t: pa.Table) -> pa.Table:
        b = np.asarray(t.column("p_brand")).astype(object)
        ty = np.asarray(t.column("p_type")).astype(object)
        bc, bu = pd.factorize(b)
        tc, tu = pd.factorize(ty)
        pack = bc.astype(np.int64) * len(tu) + tc
        u, c = np.unique(pack, return_counts=True)
        return pa.table({
            "brand": pa.array(bu.take(u // len(tu)).astype(str),
                              type=pa.string()),
            "ptype": pa.array(tu.take(u % len(tu)).astype(str),
                              type=pa.string()),
            "n": pa.array(c.astype(np.int64))})

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    agg = parts.groupby(["brand", "ptype"], as_index=False)["n"].sum()
    nb = agg.groupby("brand")["n"].transform("sum").to_numpy(np.int64)
    nt = agg.groupby("ptype")["n"].transform("sum").to_numpy(np.int64)
    N = int(agg["n"].sum())
    n = agg["n"].to_numpy(np.int64)
    agg["lift_micro"] = np.array(
        [10**6 * N * int(x) // (int(a) * int(b))
         for x, a, b in zip(n, nb, nt)], dtype=np.int64)
    return (agg.sort_values(["brand", "ptype"], kind="mergesort")
            .reset_index(drop=True)
            .astype({"n": "int64", "lift_micro": "int64"}))


def orders_updown_runs(sf_dir: str) -> pd.DataFrame:
    """Momentum/runs-test readout: the daily revenue series' UP/DOWN/
    FLAT run structure (count of runs, longest run, total days per
    direction) over the zero-filled day grid — the Wald–Wolfowitz-
    style randomness check a revenue dashboard needs before anyone
    claims a 'streak'. Per-block daily partials — ZERO shuffle; the
    run scan is day-grid-sized on the driver."""
    ds = _read(sf_dir, "orders", columns=["o_orderdate", "o_totalprice"])

    def partial(t: pa.Table) -> pa.Table:
        dy = t.column("o_orderdate").cast(pa.int64()).to_numpy() \
            // 86_400_000_000
        rev = np.floor(t.column("o_totalprice").to_numpy() * 100) \
            .astype(np.int64)
        u, inv = np.unique(dy, return_inverse=True)
        return pa.table({
            "dy": pa.array(u),
            "rev": pa.array(np.bincount(inv, weights=rev,
                                        minlength=len(u))
                            .astype(np.int64))})

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    agg = parts.groupby("dy", as_index=False)["rev"].sum()
    mn, mx = int(agg["dy"].min()), int(agg["dy"].max())
    grid = np.zeros(mx - mn + 1, dtype=np.int64)
    grid[agg["dy"].to_numpy(np.int64) - mn] = agg["rev"].to_numpy(
        np.int64)
    s = np.sign(np.diff(grid)).astype(np.int64)
    brk = np.r_[True, s[1:] != s[:-1]]
    starts = np.flatnonzero(brk)
    lens = np.diff(np.r_[starts, len(s)])
    sign_of_run = s[starts]
    rows = []
    for d in (-1, 0, 1):
        m = sign_of_run == d
        if not m.any():
            continue
        rows.append((d, int(m.sum()), int(lens[m].max()),
                     int(lens[m].sum())))
    return pd.DataFrame(rows, columns=[
        "direction", "n_runs", "longest_run", "n_days"]) \
        .astype("int64")


def events_lateness_hist(sf_dir: str, cap_min: int = 60) -> pd.DataFrame:
    """STREAMING out-of-orderness audit: per user, events arrive in
    ``event_id`` order but carry their own timestamps — the lateness
    of each event versus the per-user running max-timestamp watermark
    is exactly what sizes allowed-lateness in windowed streaming.
    Histogram of lateness minutes (capped; bucket 0 = in order). One
    ``user % 64`` bucket exchange; the per-user running max is a
    C-level grouped cummax (no Python loop); partials are ≤ cap+1
    counter rows per bucket."""
    ds = _read(sf_dir, "events", columns=["user_id", "ts", "event_id"])

    def derive(t: pa.Table) -> pa.Table:
        u = t.column("user_id").to_numpy().astype(np.int64)
        return pa.table({
            "u": pa.array(u), "ts_us": t.column("ts").cast(pa.int64()),
            "event_id": t.column("event_id"),
            "bucket": pa.array((u % 64).astype(np.int32))})

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["u", "event_id"], kind="mergesort")
        cm = g.groupby("u", sort=False)["ts_us"].cummax() \
            .to_numpy(np.int64)
        late = (cm - g["ts_us"].to_numpy(np.int64)) // 60_000_000
        lb = np.minimum(late, cap_min)
        return pd.DataFrame({
            "late_min": np.arange(cap_min + 1, dtype=np.int64),
            "n_events": np.bincount(lb, minlength=cap_min + 1)
            .astype(np.int64)})

    parts = (ds.map_batches(derive, batch_format="pyarrow")
             .groupby("bucket").map_groups(fold, batch_format="pandas")
             .to_pandas())
    out = (parts.groupby("late_min", as_index=False)["n_events"].sum()
           .sort_values("late_min", kind="mergesort")
           .reset_index(drop=True))
    return out[out["n_events"] > 0].reset_index(drop=True) \
        .astype("int64")


def sample_error_audit(sf_dir: str) -> pd.DataFrame:
    """ESTIMATOR-QUALITY audit: deterministic 1/16, 1/64 and 1/256
    hash samples of orders, each scaled up and compared against the
    exact revenue total — the error table that justifies (or kills)
    sampling a 100-TB scan. Sampling is by md5(orderkey) — the
    engine's one true hash, reproduced exactly by the twin — so the
    'sample' is a pure function of the data. Per-block partials carry
    four sums (exact + three sample legs) — ZERO shuffle."""
    from ..functions.hashing import hash64_many

    ds = _read(sf_dir, "orders", columns=["o_orderkey", "o_totalprice"])
    rates = (16, 64, 256)

    def partial(t: pa.Table) -> pa.Table:
        ok = t.column("o_orderkey").to_numpy().astype(np.int64)
        rev = np.floor(t.column("o_totalprice").to_numpy() * 100) \
            .astype(np.int64)
        h = hash64_many(str(x) for x in ok)
        cols = {"exact": pa.array([int(rev.sum())], type=pa.int64())}
        for r in rates:
            m = (h % r) == 0
            cols[f"s{r}"] = pa.array([int(rev[m].sum())],
                                     type=pa.int64())
            cols[f"n{r}"] = pa.array([int(m.sum())], type=pa.int64())
        return pa.table(cols)

    m = ds.map_batches(partial, batch_format="pyarrow").to_pandas().sum()
    tot = int(m["exact"])
    rows = []
    for r in rates:
        est = r * int(m[f"s{r}"])
        rows.append((r, int(m[f"n{r}"]), est, tot,
                     10_000 * abs(est - tot) // tot))
    return pd.DataFrame(rows, columns=[
        "sample_rate", "n_sampled", "est_cents", "exact_cents",
        "err_bps"]).astype("int64")


def lineitem_spearman(sf_dir: str) -> pd.DataFrame:
    """SPEARMAN rank correlation (tie-corrected, per return flag)
    between discount and quantity — the monotonic-association check
    Pearson misses. Both variables live on tiny discrete domains, so
    the joint histogram IS the sufficient statistic: per-block
    (flag, disc, qty, n) bincount partials (ZERO shuffle), doubled
    midranks (exact ints) from the marginals, moment sums in
    arbitrary-precision Python ints, and only the final ρ is a float —
    in the same IEEE expression order as the twin
    (num / (sqrt(d1)·sqrt(d2)) · 1000, floored)."""
    ds = _read(sf_dir, "lineitem",
               columns=["l_returnflag", "l_discount", "l_quantity"])

    def partial(t: pa.Table) -> pa.Table:
        fl = np.asarray(t.column("l_returnflag")).astype(object)
        x = np.floor(t.column("l_discount").to_numpy() * 100) \
            .astype(np.int64)
        y = np.floor(t.column("l_quantity").to_numpy()).astype(np.int64)
        code, uniq = pd.factorize(fl)
        pack = code.astype(np.int64) * (1 << 20) + x * (1 << 10) + y
        u, c = np.unique(pack, return_counts=True)
        return pa.table({
            "flag": pa.array(uniq.take(u >> 20).astype(str),
                             type=pa.string()),
            "x": pa.array((u >> 10) & 1023),
            "y": pa.array(u & 1023),
            "n": pa.array(c.astype(np.int64))})

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    hist = parts.groupby(["flag", "x", "y"], as_index=False)["n"].sum()
    rows = []
    for flag, g in hist.groupby("flag"):
        n_xy = g["n"].to_numpy(np.int64)
        n = int(n_xy.sum())

        def rank2(vals, w):
            u, inv = np.unique(vals, return_inverse=True)
            cnt = np.bincount(inv, weights=w).astype(np.int64)
            cum = np.r_[0, cnt.cumsum()[:-1]]
            return (2 * cum + cnt + 1)[inv]

        rx = rank2(g["x"].to_numpy(np.int64), n_xy)
        ry = rank2(g["y"].to_numpy(np.int64), n_xy)
        sx = int((n_xy * rx).sum())
        sy = int((n_xy * ry).sum())
        sxx = int((n_xy * rx * rx).sum())
        syy = int((n_xy * ry * ry).sum())
        sxy = int((n_xy * rx * ry).sum())
        num = n * sxy - sx * sy
        d1 = n * sxx - sx * sx
        d2 = n * syy - sy * sy
        import math
        val = math.floor(float(num)
                         / (math.sqrt(float(d1)) * math.sqrt(float(d2)))
                         * 1000)
        rows.append((str(flag), n, val))
    rows.sort()
    return pd.DataFrame(rows, columns=["l_returnflag", "n",
                                       "spearman_milli"]) \
        .astype({"n": "int64", "spearman_milli": "int64"})


def events_diurnal_concentration(sf_dir: str) -> pd.DataFrame:
    """Diurnal CONCENTRATION per event type: the peak hour-of-day and
    the share of all events landing in the top-3 hours (bps) — the
    log-free time-of-day seasonality readout that sizes off-peak batch
    windows. Per-block (type, hour, n) partials — ZERO shuffle; the
    driver grid is types × 24."""
    ds = _read(sf_dir, "events", columns=["event_type", "ts"])

    def partial(t: pa.Table) -> pa.Table:
        et = np.asarray(t.column("event_type")).astype(object)
        hr = (t.column("ts").cast(pa.int64()).to_numpy()
              // 3_600_000_000) % 24
        code, uniq = pd.factorize(et)
        pack = code.astype(np.int64) * 24 + hr
        u, c = np.unique(pack, return_counts=True)
        return pa.table({
            "ty": pa.array(uniq.take(u // 24).astype(str),
                           type=pa.string()),
            "hr": pa.array(u % 24),
            "n": pa.array(c.astype(np.int64))})

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    hist = parts.groupby(["ty", "hr"], as_index=False)["n"].sum()
    rows = []
    for ty, g in hist.groupby("ty"):
        n = g["n"].to_numpy(np.int64)
        hr = g["hr"].to_numpy(np.int64)
        order = np.lexsort((hr, -n))
        tot = int(n.sum())
        top3 = int(n[order[:3]].sum())
        rows.append((str(ty), int(hr[order[0]]),
                     10_000 * top3 // tot, tot))
    rows.sort()
    return pd.DataFrame(rows, columns=[
        "event_type", "peak_hour", "top3_share_bps", "n_events"]) \
        .astype({"peak_hour": "int64", "top3_share_bps": "int64",
                 "n_events": "int64"})


def session_threshold_sensitivity(sf_dir: str) -> pd.DataFrame:
    """Sessionization PARAMETER-SENSITIVITY curve: total session count
    at gap thresholds 5/15/30/60/120 minutes, from the identity
    ``sessions(T) = users + #gaps>T`` — one pass over the gaps answers
    every threshold, which is how you pick the 30-minute constant
    instead of inheriting it. One ``user % 64`` bucket exchange;
    per-bucket partials are 5 threshold counters + a user count."""
    ds = _read(sf_dir, "events", columns=["user_id", "ts", "event_id"])
    thresholds = np.array([5, 15, 30, 60, 120], dtype=np.int64)

    def derive(t: pa.Table) -> pa.Table:
        u = t.column("user_id").to_numpy().astype(np.int64)
        return pa.table({
            "u": pa.array(u), "ts_us": t.column("ts").cast(pa.int64()),
            "event_id": t.column("event_id"),
            "bucket": pa.array((u % 64).astype(np.int32))})

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        u = g["u"].to_numpy(np.int64)
        ts = g["ts_us"].to_numpy(np.int64)
        e = g["event_id"].to_numpy(np.int64)
        order = np.lexsort((e, ts, u))
        us, tss = u[order], ts[order]
        same = us[1:] == us[:-1]
        gap = (tss[1:] - tss[:-1])[same]
        n_users = int((~np.r_[False, same]).sum())
        over = np.array([(gap > t * 60_000_000).sum()
                         for t in thresholds], dtype=np.int64)
        return pd.DataFrame({"threshold_min": thresholds,
                             "n_over": over,
                             "n_users": np.full(len(thresholds), n_users,
                                                dtype=np.int64)})

    parts = (ds.map_batches(derive, batch_format="pyarrow")
             .groupby("bucket").map_groups(fold, batch_format="pandas")
             .to_pandas())
    agg = (parts.groupby("threshold_min", as_index=False).sum()
           .sort_values("threshold_min", kind="mergesort")
           .reset_index(drop=True))
    return pd.DataFrame({
        "threshold_min": agg["threshold_min"],
        "n_sessions": agg["n_users"] + agg["n_over"]}).astype("int64")


def events_type_xcorr(sf_dir: str, type_x: str = "click",
                      type_y: str = "purchase",
                      max_lag: int = 7) -> pd.DataFrame:
    """CROSS-correlation between two event types' daily-volume series
    at lags 0..7 — 'do clicks today predict purchases in k days'. The
    lag-k moments run over the overlap window of the zero-filled day
    grid; every moment is an exact integer and only the final
    correlation is a float in the same IEEE expression order as the
    twin (the ``lineitem_corr`` discipline). Per-block (type, day, n)
    partials — ZERO shuffle; the lag sweep is grid-sized on the
    driver."""
    import math

    ds = _read(sf_dir, "events", columns=["event_type", "ts"])

    def partial(t: pa.Table) -> pa.Table:
        et = np.asarray(t.column("event_type")).astype(object)
        dy = t.column("ts").cast(pa.int64()).to_numpy() // 86_400_000_000
        keep = (et == type_x) | (et == type_y)
        isx = (et[keep] == type_x).astype(np.int64)
        d = dy[keep]
        pack = d * 2 + isx
        u, c = np.unique(pack, return_counts=True)
        return pa.table({
            "dy": pa.array(u // 2), "isx": pa.array(u % 2),
            "n": pa.array(c.astype(np.int64)),
            "mn": pa.array(np.full(len(u), dy.min(), dtype=np.int64)),
            "mx": pa.array(np.full(len(u), dy.max(), dtype=np.int64))})

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    mn, mx = int(parts["mn"].min()), int(parts["mx"].max())
    G = mx - mn + 1
    x = np.zeros(G, dtype=np.int64)
    y = np.zeros(G, dtype=np.int64)
    agg = parts.groupby(["dy", "isx"], as_index=False)["n"].sum()
    for _, r in agg.iterrows():
        (x if int(r["isx"]) else y)[int(r["dy"]) - mn] += int(r["n"])
    rows = []
    for k in range(max_lag + 1):
        xs, ys = x[:G - k], y[k:]
        n = len(xs)
        sx, sy = int(xs.sum()), int(ys.sum())
        sxx = int((xs * xs).sum())
        syy = int((ys * ys).sum())
        sxy = int((xs * ys).sum())
        num = n * sxy - sx * sy
        d1 = n * sxx - sx * sx
        d2 = n * syy - sy * sy
        val = math.floor(float(num)
                         / (math.sqrt(float(d1)) * math.sqrt(float(d2)))
                         * 1000)
        rows.append((k, n, val))
    return pd.DataFrame(rows, columns=["lag_days", "n_days",
                                       "xcorr_milli"]).astype("int64")


def user_lifecycle_census(sf_dir: str) -> pd.DataFrame:
    """Lifecycle STAGE census at the dataset horizon: every user binned
    as new (first seen in the last 28 days), active (event in the last
    7), lapsed (8–28 days quiet) or dormant — the complement of the
    training-oriented ``user_churn_labels`` point-in-time labels; this
    is the population snapshot an ops dashboard shows. Pass 1 is a
    1-row-per-block max-day fold; pass 2 is one ``user % 64`` bucket
    exchange emitting 4 stage counters per bucket."""
    ds = _read(sf_dir, "events", columns=["user_id", "ts"])

    def maxday(t: pa.Table) -> pa.Table:
        d = t.column("ts").cast(pa.int64()).to_numpy() // 86_400_000_000
        return pa.table({"mx": pa.array([int(d.max())])})

    end = int(ds.map_batches(maxday, batch_format="pyarrow")
              .to_pandas()["mx"].max())

    def derive(t: pa.Table) -> pa.Table:
        u = t.column("user_id").to_numpy().astype(np.int64)
        d = t.column("ts").cast(pa.int64()).to_numpy() // 86_400_000_000
        return pa.table({"u": pa.array(u), "d": pa.array(d),
                         "bucket": pa.array((u % 64).astype(np.int32))})

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        u = g["u"].to_numpy(np.int64)
        d = g["d"].to_numpy(np.int64)
        order = np.lexsort((d, u))
        us, dsr = u[order], d[order]
        starts = np.flatnonzero(np.r_[True, us[1:] != us[:-1]])
        first = dsr[starts]
        last = dsr[np.r_[starts[1:], len(us)] - 1]
        stage = np.where(first >= end - 27, 0,
                         np.where(last >= end - 6, 1,
                                  np.where(last >= end - 27, 2, 3)))
        return pd.DataFrame({
            "stage": np.arange(4, dtype=np.int64),
            "n_users": np.bincount(stage, minlength=4)
            .astype(np.int64)})

    parts = (ds.map_batches(derive, batch_format="pyarrow")
             .groupby("bucket").map_groups(fold, batch_format="pandas")
             .to_pandas())
    agg = (parts.groupby("stage", as_index=False)["n_users"].sum()
           .sort_values("stage", kind="mergesort").reset_index(drop=True))
    names = np.array(["new", "active", "lapsed", "dormant"],
                     dtype=object)
    agg.insert(1, "stage_name", names[agg["stage"].to_numpy(np.int64)])
    agg = agg[agg["n_users"] > 0].reset_index(drop=True)
    return agg.astype({"stage": "int64", "n_users": "int64"})


def events_kanon_audit(sf_dir: str) -> pd.DataFrame:
    """K-ANONYMITY-style re-identification audit: per event type, users
    binned by how often they appear (1 / 2–4 / 5–19 / 20+), with the
    share of users below the k=5 line — the privacy-review table that
    says which event streams would expose rare users if released. One
    ``user % 64`` bucket exchange; per-bucket partials are
    (types × 4) counters."""
    ds = _read(sf_dir, "events", columns=["user_id", "event_type"])

    def derive(t: pa.Table) -> pa.Table:
        u = t.column("user_id").to_numpy().astype(np.int64)
        return pa.table({"u": pa.array(u), "ty": t.column("event_type"),
                         "bucket": pa.array((u % 64).astype(np.int32))})

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        u = g["u"].to_numpy(np.int64)
        code, uniq = pd.factorize(g["ty"].to_numpy(object))
        k = len(uniq)
        pack = u * k + code
        _, cnt = np.unique(pack, return_counts=True)
        upart = np.unique(pack)
        tcode = (upart % k).astype(np.int64)
        cls = np.where(cnt == 1, 0,
                       np.where(cnt <= 4, 1,
                                np.where(cnt <= 19, 2, 3)))
        out = np.zeros((k, 4), dtype=np.int64)
        np.add.at(out, (tcode, cls), 1)
        return pd.DataFrame({
            "ty": np.repeat(np.asarray(uniq, dtype=object), 4),
            "cls": np.tile(np.arange(4, dtype=np.int64), k),
            "nu": out.ravel()})

    parts = (ds.map_batches(derive, batch_format="pyarrow")
             .groupby("bucket").map_groups(fold, batch_format="pandas")
             .to_pandas())
    agg = parts.groupby(["ty", "cls"], as_index=False)["nu"].sum()
    agg = agg[agg["nu"] > 0]
    tot = agg.groupby("ty")["nu"].transform("sum").to_numpy(np.int64)
    risk = agg.assign(r=np.where(agg["cls"] <= 1, agg["nu"], 0)) \
        .groupby("ty")["r"].transform("sum").to_numpy(np.int64)
    agg["risk_share_bps"] = 10_000 * risk // tot
    return (agg.sort_values(["ty", "cls"], kind="mergesort")
            .reset_index(drop=True)
            .rename(columns={"ty": "event_type", "cls": "freq_class",
                             "nu": "n_users"})
            .astype({"freq_class": "int64", "n_users": "int64",
                     "risk_share_bps": "int64"}))


def quantile_sketch_error(sf_dir: str) -> pd.DataFrame:
    """Sketch-accuracy AUDIT: the 50-cent fixed-width histogram
    quantile sketch (``events_value_histogram``'s rule) versus the
    exact dense-histogram quantile, per percentile — the table that
    certifies the cheap sketch's error bound before anyone trusts it
    at 100 TB. Both estimates come from the SAME zero-shuffle dense
    count vector (the bin view is a reshape), so the audit costs one
    fold; error is exact cents and bounded by the bin width by
    construction."""
    ds = _read(sf_dir, "events", columns=["value"])

    def mm_partial(t: pa.Table) -> pa.Table:
        v = np.floor(t.column("value").to_numpy() * 100).astype(np.int64)
        return pa.table({"lo": pa.array([int(v.min())]),
                         "hi": pa.array([int(v.max())]),
                         "n": pa.array([len(v)])})

    mm = ds.map_batches(mm_partial, batch_format="pyarrow").to_pandas()
    lo, hi, n = (int(mm["lo"].min()), int(mm["hi"].max()),
                 int(mm["n"].sum()))

    def hist_partial(t: pa.Table) -> pa.Table:
        v = np.floor(t.column("value").to_numpy() * 100).astype(np.int64)
        cnt = np.bincount(v - lo, minlength=hi - lo + 1).astype(np.int64)
        return pa.table({"v": pa.array([cnt.tobytes()],
                                       type=pa.large_binary())})

    total = np.zeros(hi - lo + 1, dtype=np.int64)
    for row in (ds.map_batches(hist_partial, batch_format="pyarrow")
                .take_all()):
        total += np.frombuffer(row["v"], dtype=np.int64)
    cum = total.cumsum()
    # 50-cent bin view of the SAME counts (bins are absolute cents//50)
    b_lo, b_hi = lo // 50, hi // 50
    bins = np.zeros(b_hi - b_lo + 1, dtype=np.int64)
    np.add.at(bins, (np.arange(lo, hi + 1) // 50) - b_lo, total)
    bcum = bins.cumsum()
    rows = []
    for q in (25, 50, 75, 90, 99):
        rank = -(-q * n // 100)
        exact = lo + int(np.searchsorted(cum, rank))
        sketch = (b_lo + int(np.searchsorted(bcum, rank))) * 50
        rows.append((q, exact, sketch, exact - sketch))
    return pd.DataFrame(rows, columns=[
        "q_pct", "exact_cents", "sketch_cents", "err_cents"]) \
        .astype("int64")


def purchase_latency_slo(sf_dir: str,
                         slo_us: int = 1_800_000_000) -> pd.DataFrame:
    """SLO BURN table: every purchase joined as-of to the user's latest
    click at-or-before it; per week, the share of conversions slower
    than the 30-minute SLO in exact bps — the SRE-style error-budget
    series over the funnel. One ``user % 64`` bucket exchange; inside
    the bucket the as-of probe is one searchsorted over dense-coded
    (user, ts) keys (user in the high bits, so probes never cross
    users); per-bucket partials are week-grid rows."""
    ds = _read(sf_dir, "events",
               columns=["user_id", "ts", "event_type", "event_id"])

    def derive(t: pa.Table) -> pa.Table:
        et = t.column("event_type").to_numpy(zero_copy_only=False)
        keep = (et == "click") | (et == "purchase")
        u = t.column("user_id").to_numpy().astype(np.int64)[keep]
        ts = t.column("ts").cast(pa.int64()).to_numpy()[keep]
        return pa.table({
            "u": pa.array(u), "ts_us": pa.array(ts),
            "is_click": pa.array(et[keep] == "click"),
            "bucket": pa.array((u % 64).astype(np.int32))})

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        u = g["u"].to_numpy(np.int64)
        ts = g["ts_us"].to_numpy(np.int64)
        ic = g["is_click"].to_numpy(bool)
        uu = np.unique(u)
        code = np.searchsorted(uu, u).astype(np.int64)
        t0 = ts.min()
        key = code * (1 << 52) + (ts - t0)
        cmask = ic
        ckey = np.sort(key[cmask])
        pkey = key[~cmask]
        pos = np.searchsorted(ckey, pkey, side="right") - 1
        has = pos >= 0
        # same-user guard: the found click must share the user code
        cu = ckey[np.maximum(pos, 0)] >> 52
        pu = pkey >> 52
        has &= cu == pu
        lat = (pkey[has] & ((1 << 52) - 1)) \
            - (ckey[np.maximum(pos, 0)][has] & ((1 << 52) - 1))
        wk = (ts[~cmask][has]) // 604_800_000_000
        slow = (lat > slo_us).astype(np.int64)
        uwk, inv = np.unique(wk, return_inverse=True)
        return pd.DataFrame({
            "wk": uwk,
            "n": np.bincount(inv, minlength=len(uwk)).astype(np.int64),
            "slow": np.bincount(inv, weights=slow, minlength=len(uwk))
            .astype(np.int64)})

    parts = (ds.map_batches(derive, batch_format="pyarrow")
             .groupby("bucket").map_groups(fold, batch_format="pandas")
             .to_pandas())
    agg = (parts.groupby("wk", as_index=False).sum()
           .sort_values("wk", kind="mergesort").reset_index(drop=True))
    return pd.DataFrame({
        "week_index": agg["wk"].to_numpy(np.int64),
        "n_conversions": agg["n"].to_numpy(np.int64),
        "n_slow": agg["slow"].to_numpy(np.int64),
        "slow_share_bps": 10_000 * agg["slow"].to_numpy(np.int64)
        // agg["n"].to_numpy(np.int64)}).astype("int64")


def orders_rescaled_range(sf_dir: str) -> pd.DataFrame:
    """R/S (rescaled-range) RANGE table over the daily revenue series —
    the long-range-dependence diagnostic behind the Hurst exponent,
    kept fully integer by scaling deviations by the window size
    (``dᵢ = w·revᵢ − Σw``, so the cumulative-deviation range is exact
    cents·w with no division anywhere). For each window size
    w ∈ {8, 16, 32, 64}: the number of full non-overlapping windows
    and the summed range. Per-block daily partials — ZERO shuffle; the
    sweep is day-grid-sized on the driver."""
    ds = _read(sf_dir, "orders", columns=["o_orderdate", "o_totalprice"])

    def partial(t: pa.Table) -> pa.Table:
        dy = t.column("o_orderdate").cast(pa.int64()).to_numpy() \
            // 86_400_000_000
        rev = np.floor(t.column("o_totalprice").to_numpy() * 100) \
            .astype(np.int64)
        u, inv = np.unique(dy, return_inverse=True)
        return pa.table({
            "dy": pa.array(u),
            "rev": pa.array(np.bincount(inv, weights=rev,
                                        minlength=len(u))
                            .astype(np.int64))})

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    agg = parts.groupby("dy", as_index=False)["rev"].sum()
    mn, mx = int(agg["dy"].min()), int(agg["dy"].max())
    grid = np.zeros(mx - mn + 1, dtype=np.int64)
    grid[agg["dy"].to_numpy(np.int64) - mn] = agg["rev"].to_numpy(
        np.int64)
    rows = []
    for w in (8, 16, 32, 64):
        nw = len(grid) // w
        if nw == 0:
            continue
        blk = grid[:nw * w].reshape(nw, w)
        dev = w * blk - blk.sum(axis=1, keepdims=True)
        cum = dev.cumsum(axis=1)
        rng = cum.max(axis=1) - cum.min(axis=1)
        rows.append((w, nw, int(rng.sum())))
    return pd.DataFrame(rows, columns=[
        "window_days", "n_windows", "sum_range_scaled"]) \
        .astype("int64")


def orders_theil_sen(sf_dir: str) -> pd.DataFrame:
    """THEIL–SEN robust trend of daily revenue: the median of all
    pairwise day-slopes — the estimator that shrugs off the outlier
    days OLS chases. Each pair's slope is the sign-normalized integer
    ``sgn·(10⁶·|Δrev| // Δd)`` (toward-zero, matching DuckDB), and the
    reported slope is the discrete lower median plus the quartiles of
    the slope distribution. Per-block daily partials — ZERO shuffle;
    the O(G²) pair sweep runs on the day GRID (calendar-bounded —
    ~3M pairs for a decade — never on rows)."""
    ds = _read(sf_dir, "orders", columns=["o_orderdate", "o_totalprice"])

    def partial(t: pa.Table) -> pa.Table:
        dy = t.column("o_orderdate").cast(pa.int64()).to_numpy() \
            // 86_400_000_000
        rev = np.floor(t.column("o_totalprice").to_numpy() * 100) \
            .astype(np.int64)
        u, inv = np.unique(dy, return_inverse=True)
        return pa.table({
            "dy": pa.array(u),
            "rev": pa.array(np.bincount(inv, weights=rev,
                                        minlength=len(u))
                            .astype(np.int64))})

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    agg = (parts.groupby("dy", as_index=False)["rev"].sum()
           .sort_values("dy", kind="mergesort"))
    d = agg["dy"].to_numpy(np.int64)
    r = agg["rev"].to_numpy(np.int64)
    i, j = np.triu_indices(len(d), k=1)
    dd = d[j] - d[i]
    dr = r[j] - r[i]
    mag = (10**6 * np.abs(dr)) // dd
    slopes = np.where(dr < 0, -mag, mag)
    slopes.sort()
    n = len(slopes)

    def disc_q(q_num: int, q_den: int) -> int:
        # quantile_disc: element at rank ceil(q·n), 1-indexed
        rank = -(-q_num * n // q_den)
        return int(slopes[rank - 1])

    return pd.DataFrame([(len(d), n, disc_q(1, 4), disc_q(1, 2),
                          disc_q(3, 4))],
                        columns=["n_days", "n_pairs", "slope_p25_micro",
                                 "slope_median_micro",
                                 "slope_p75_micro"]).astype("int64")


def events_cuped_adjust(sf_dir: str) -> pd.DataFrame:
    """CUPED variance reduction (the experimentation-platform
    workhorse): users mock-assigned to arms by id parity, value split
    into PRE/POST halves of the window; θ = cov(pre,post)/var(pre) in
    sign-normalized fixed point and the variance-reduction factor
    ρ²·10⁴ as the staged division-exact
    ``((10⁴·|num|)//d1)·|num| // d2`` — every moment an exact integer,
    nothing random. Pass 1 bounds the window
    (min/max day fold); pass 2 is one ``user % 64`` bucket exchange
    emitting per-arm moment partials (2 rows per bucket)."""
    ds = _read(sf_dir, "events", columns=["user_id", "ts", "value"])

    def minmax(t: pa.Table) -> pa.Table:
        d = t.column("ts").cast(pa.int64()).to_numpy() // 86_400_000_000
        return pa.table({"mn": pa.array([int(d.min())]),
                         "mx": pa.array([int(d.max())])})

    mm = ds.map_batches(minmax, batch_format="pyarrow").to_pandas()
    mid = (int(mm["mn"].min()) + int(mm["mx"].max()) + 1) // 2

    def derive(t: pa.Table) -> pa.Table:
        u = t.column("user_id").to_numpy().astype(np.int64)
        d = t.column("ts").cast(pa.int64()).to_numpy() // 86_400_000_000
        cents = np.floor(t.column("value").to_numpy() * 100) \
            .astype(np.int64)
        return pa.table({
            "u": pa.array(u), "post": pa.array((d >= mid)
                                               .astype(np.int8)),
            "cents": pa.array(cents),
            "bucket": pa.array((u % 64).astype(np.int32))})

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        u = g["u"].to_numpy(np.int64)
        post = g["post"].to_numpy(np.int8).astype(np.int64)
        c = g["cents"].to_numpy(np.int64)
        uu, inv = np.unique(u, return_inverse=True)
        pre_s = np.bincount(inv, weights=c * (1 - post),
                            minlength=len(uu)).astype(np.int64)
        post_s = np.bincount(inv, weights=c * post,
                             minlength=len(uu)).astype(np.int64)
        arm = (uu % 2).astype(np.int64)
        out = []
        for a in (0, 1):
            m = arm == a
            x, y = pre_s[m], post_s[m]
            out.append((a, int(m.sum()), int(x.sum()), int(y.sum()),
                        int((x * x).sum()), int((y * y).sum()),
                        int((x * y).sum())))
        return pd.DataFrame(out, columns=["arm", "n", "sx", "sy",
                                          "sxx", "syy", "sxy"])

    parts = (ds.map_batches(derive, batch_format="pyarrow")
             .groupby("bucket").map_groups(fold, batch_format="pandas")
             .to_pandas())
    agg = parts.groupby("arm", as_index=False).sum()
    # pooled theta / rho^2 over ALL users (both arms)
    n = int(agg["n"].sum())
    sx, sy = int(agg["sx"].sum()), int(agg["sy"].sum())
    sxx, syy = int(agg["sxx"].sum()), int(agg["syy"].sum())
    sxy = int(agg["sxy"].sum())
    num = n * sxy - sx * sy
    d1 = n * sxx - sx * sx
    d2 = n * syy - sy * sy
    sgn = -1 if (num < 0) != (d1 < 0) else 1
    theta_micro = sgn * ((10**6 * abs(num)) // abs(d1))
    # staged division keeps every intermediate inside HUGEINT for the
    # twin (10^4·num² would not); d1, d2 are variances, never negative
    varred_bps = ((10**4 * abs(num)) // d1) * abs(num) // d2
    out = agg.sort_values("arm").reset_index(drop=True)
    out["theta_micro"] = np.int64(theta_micro)
    out["varred_bps"] = np.int64(varred_bps)
    return out[["arm", "n", "sx", "sy", "theta_micro",
                "varred_bps"]].rename(columns={
                    "sx": "sum_pre_cents", "sy": "sum_post_cents"}) \
        .astype("int64")


def orders_seasonal_strength(sf_dir: str) -> pd.DataFrame:
    """SEASONALITY STRENGTH as an ANOVA variance share: for candidate
    periods 7 and 30 days, the between-phase share of daily-revenue
    variance in bps via the division-mirrored identity
    ``(Σ_g N·S_g² // n_g − S²) / (N·Q − S²)`` (per-phase truncation
    identical on both sides) — strong weekly seasonality ⇒ the p=7 row
    ≈ its ceiling. Per-block daily partials — ZERO shuffle; the phase
    fold is ≤ p rows per period on the driver."""
    ds = _read(sf_dir, "orders", columns=["o_orderdate", "o_totalprice"])

    def partial(t: pa.Table) -> pa.Table:
        dy = t.column("o_orderdate").cast(pa.int64()).to_numpy() \
            // 86_400_000_000
        rev = np.floor(t.column("o_totalprice").to_numpy() * 100) \
            .astype(np.int64)
        u, inv = np.unique(dy, return_inverse=True)
        return pa.table({
            "dy": pa.array(u),
            "rev": pa.array(np.bincount(inv, weights=rev,
                                        minlength=len(u))
                            .astype(np.int64))})

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    agg = parts.groupby("dy", as_index=False)["rev"].sum()
    mn, mx = int(agg["dy"].min()), int(agg["dy"].max())
    grid = np.zeros(mx - mn + 1, dtype=np.int64)
    grid[agg["dy"].to_numpy(np.int64) - mn] = agg["rev"].to_numpy(
        np.int64)
    N = len(grid)
    S = int(grid.sum())
    # python-int squares: daily cents² overflows int64 at scale
    Q = sum(int(v) * int(v) for v in grid)
    days = np.arange(mn, mx + 1, dtype=np.int64)
    rows = []
    for p in (7, 30):
        ph = days % p
        sg = np.bincount(ph, weights=grid, minlength=p).astype(np.int64)
        ng = np.bincount(ph, minlength=p).astype(np.int64)
        ssbn = sum(N * int(s) * int(s) // int(c)
                   for s, c in zip(sg, ng) if c > 0)
        rows.append((p, 10**4 * (ssbn - S * S)
                     // (N * Q - S * S)))
    return pd.DataFrame(rows, columns=["period_days",
                                       "strength_bps"]).astype("int64")


def customer_order_class_migration(sf_dir: str) -> pd.DataFrame:
    """Entity-level DRIFT matrix: customers classed by order count
    (0 / 1 / 2–4 / 5+) in the first half of the window vs the second,
    and the migration matrix between the classes — who ramped up, who
    went quiet; the per-entity complement of the distribution-level
    ``events_drift_tv``. Pass 1 bounds the window; pass 2 is one
    ``customer % 64`` bucket exchange emitting 16 matrix-cell counters
    per bucket (customers with no orders at all are absent on both
    sides)."""
    ds = _read(sf_dir, "orders", columns=["o_custkey", "o_orderdate"])

    def minmax(t: pa.Table) -> pa.Table:
        d = t.column("o_orderdate").cast(pa.int64()).to_numpy() \
            // 86_400_000_000
        return pa.table({"mn": pa.array([int(d.min())]),
                         "mx": pa.array([int(d.max())])})

    mm = ds.map_batches(minmax, batch_format="pyarrow").to_pandas()
    mid = (int(mm["mn"].min()) + int(mm["mx"].max()) + 1) // 2

    def derive(t: pa.Table) -> pa.Table:
        c = t.column("o_custkey").to_numpy().astype(np.int64)
        d = t.column("o_orderdate").cast(pa.int64()).to_numpy() \
            // 86_400_000_000
        return pa.table({
            "c": pa.array(c),
            "h": pa.array((d >= mid).astype(np.int8)),
            "bucket": pa.array((c % 64).astype(np.int32))})

    def cls(n: np.ndarray) -> np.ndarray:
        return np.where(n == 0, 0,
                        np.where(n == 1, 1,
                                 np.where(n <= 4, 2, 3)))

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        c = g["c"].to_numpy(np.int64)
        h = g["h"].to_numpy(np.int8).astype(np.int64)
        uu, inv = np.unique(c, return_inverse=True)
        n1 = np.bincount(inv, weights=1 - h, minlength=len(uu)) \
            .astype(np.int64)
        n2 = np.bincount(inv, weights=h, minlength=len(uu)) \
            .astype(np.int64)
        cell = cls(n1) * 4 + cls(n2)
        return pd.DataFrame({
            "cell": np.arange(16, dtype=np.int64),
            "n_customers": np.bincount(cell, minlength=16)
            .astype(np.int64)})

    parts = (ds.map_batches(derive, batch_format="pyarrow")
             .groupby("bucket").map_groups(fold, batch_format="pandas")
             .to_pandas())
    agg = (parts.groupby("cell", as_index=False)["n_customers"].sum())
    agg = agg[agg["n_customers"] > 0]
    out = pd.DataFrame({
        "class_h1": agg["cell"].to_numpy(np.int64) // 4,
        "class_h2": agg["cell"].to_numpy(np.int64) % 4,
        "n_customers": agg["n_customers"].to_numpy(np.int64)})
    return (out.sort_values(["class_h1", "class_h2"], kind="mergesort")
            .reset_index(drop=True).astype("int64"))


def orders_month_end_effect(sf_dir: str) -> pd.DataFrame:
    """Calendar-effect audit: the share of each month's revenue booked
    in its LAST THREE days (bps) — the quota-stuffing / batch-posting
    fingerprint. Month lengths come from pure datetime64 month
    arithmetic here and ``last_day()`` in the twin — no calendar
    tables. Per-block (month, total, last3) partials — ZERO shuffle;
    the driver fold is month-grid-sized."""
    ds = _read(sf_dir, "orders", columns=["o_orderdate", "o_totalprice"])

    def partial(t: pa.Table) -> pa.Table:
        d64 = t.column("o_orderdate").to_numpy() \
            .astype("datetime64[D]")
        m64 = d64.astype("datetime64[M]")
        m = m64.astype(np.int64)
        dom = (d64 - m64.astype("datetime64[D]")).astype(np.int64) + 1
        mlen = ((m64 + 1).astype("datetime64[D]")
                - m64.astype("datetime64[D]")).astype(np.int64)
        rev = np.floor(t.column("o_totalprice").to_numpy() * 100) \
            .astype(np.int64)
        last3 = (dom > mlen - 3).astype(np.int64)
        u, inv = np.unique(m, return_inverse=True)
        return pa.table({
            "m": pa.array(u),
            "rev": pa.array(np.bincount(inv, weights=rev,
                                        minlength=len(u))
                            .astype(np.int64)),
            "l3": pa.array(np.bincount(inv, weights=rev * last3,
                                       minlength=len(u))
                           .astype(np.int64))})

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    agg = (parts.groupby("m", as_index=False).sum()
           .sort_values("m", kind="mergesort").reset_index(drop=True))
    return pd.DataFrame({
        "month_index": agg["m"].to_numpy(np.int64),
        "rev_cents": agg["rev"].to_numpy(np.int64),
        "last3_cents": agg["l3"].to_numpy(np.int64),
        "last3_share_bps": 10_000 * agg["l3"].to_numpy(np.int64)
        // agg["rev"].to_numpy(np.int64)}).astype("int64")


def session_entry_conversion(sf_dir: str,
                             gap_us: int = 1_800_000_000) -> \
        pd.DataFrame:
    """LANDING-PAGE analysis, sessionized: conversion share (session
    contains a purchase) by the session's ENTRY event type — which
    front door converts. One ``user % 64`` bucket exchange; the fold
    sessionizes by vectorized gap breaks, reads entries at segment
    heads and flags purchases via a segment-max reduceat — partials
    are (types × 2) counters per bucket."""
    ds = _read(sf_dir, "events",
               columns=["user_id", "ts", "event_id", "event_type"])

    def derive(t: pa.Table) -> pa.Table:
        u = t.column("user_id").to_numpy().astype(np.int64)
        return pa.table({
            "u": pa.array(u), "ts_us": t.column("ts").cast(pa.int64()),
            "event_id": t.column("event_id"),
            "ty": t.column("event_type"),
            "bucket": pa.array((u % 64).astype(np.int32))})

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        u = g["u"].to_numpy(np.int64)
        ts = g["ts_us"].to_numpy(np.int64)
        e = g["event_id"].to_numpy(np.int64)
        order = np.lexsort((e, ts, u))
        us, tss = u[order], ts[order]
        ty = g["ty"].to_numpy(object)[order]
        brk = np.ones(len(us), dtype=bool)
        brk[1:] = (us[1:] != us[:-1]) | (tss[1:] - tss[:-1] > gap_us)
        starts = np.flatnonzero(brk)
        isp = (ty == "purchase").astype(np.int64)
        conv = np.maximum.reduceat(isp, starts)
        entry = ty[starts]
        df = pd.DataFrame({"entry": entry, "conv": conv})
        out = df.groupby("entry", as_index=False).agg(
            n_sessions=("conv", "size"), n_converted=("conv", "sum"))
        return out

    parts = (ds.map_batches(derive, batch_format="pyarrow")
             .groupby("bucket").map_groups(fold, batch_format="pandas")
             .to_pandas())
    agg = (parts.groupby("entry", as_index=False).sum()
           .sort_values("entry", kind="mergesort")
           .reset_index(drop=True))
    agg["conv_bps"] = 10_000 * agg["n_converted"].to_numpy(np.int64) \
        // agg["n_sessions"].to_numpy(np.int64)
    return agg.rename(columns={"entry": "entry_type"}) \
        .astype({"n_sessions": "int64", "n_converted": "int64",
                 "conv_bps": "int64"})


def tombstone_impact_audit(sf_dir: str) -> pd.DataFrame:
    """DELETION-PROPAGATION audit (the GDPR erasure dry-run): a
    deterministic ~1/128 tombstone set of entity ids
    (``md5(id) % 128 == 0``) and, per table, how many rows and
    distinct entities it touches — the blast-radius table a privacy
    review signs off before the actual delete. Zero shuffle: each
    block emits (rows, affected-rows, affected-id uniques); only the
    ~1% affected ids reach the driver."""
    from ..functions.hashing import hash64_many

    specs = [("events", "user_id"), ("orders", "o_custkey"),
             ("customer", "c_custkey")]
    rows = []
    for table, col in specs:
        ds = _read(sf_dir, table, columns=[col])

        def partial(t: pa.Table, col=col) -> pa.Table:
            ids = t.column(col).to_numpy().astype(np.int64)
            uids = np.unique(ids)
            hit_u = uids[(hash64_many(str(x) for x in uids)
                          % 128) == 0]
            if len(hit_u):
                pos = np.minimum(np.searchsorted(hit_u, ids),
                                 len(hit_u) - 1)
                hit = hit_u[pos] == ids
            else:
                hit = np.zeros(len(ids), dtype=bool)
            return pa.table({
                "n": pa.array([len(ids)], type=pa.int64()),
                "na": pa.array([int(hit.sum())], type=pa.int64()),
                "ids": pa.array([hit_u.tobytes()],
                                type=pa.large_binary())})

        parts = ds.map_batches(partial, batch_format="pyarrow") \
            .take_all()
        n = sum(int(r["n"]) for r in parts)
        na = sum(int(r["na"]) for r in parts)
        ents = np.unique(np.concatenate(
            [np.frombuffer(r["ids"], dtype=np.int64) for r in parts]))
        rows.append((table, n, na, 10_000 * na // n, len(ents)))
    return pd.DataFrame(rows, columns=[
        "table_name", "n_rows", "n_affected", "share_bps",
        "n_entities"]).astype({"n_rows": "int64", "n_affected": "int64",
                               "share_bps": "int64",
                               "n_entities": "int64"})


def catalog_profile(sf_dir: str) -> pd.DataFrame:
    """One-line CATALOG profile: row count per table — the cheapest
    sanity gate a pipeline runs before anything else (a table that
    shrank overnight fails here first). Counts come from parquet
    metadata via Ray's zero-read count()."""
    tables = ("region nation customer supplier part orders lineitem "
              "events documents embeddings").split()
    rows = []
    for t in tables:
        n = ray.data.read_parquet(f"{sf_dir}/{t}.parquet").count()
        rows.append((t, int(n)))
    rows.sort()
    return pd.DataFrame(rows, columns=["table_name", "n_rows"]) \
        .astype({"n_rows": "int64"})


def events_gap_memory(sf_dir: str) -> pd.DataFrame:
    """Renewal-process MEMORY: the correlation between consecutive
    inter-event gaps pooled across users — positive means long waits
    follow long waits (sticky sessions), ~0 means memoryless arrivals.
    Gap pairs never leave the bucket: one ``user % 64`` exchange, each
    fold emits a single 6-moment partial row over its (gᵢ, gᵢ₊₁)
    pairs (seconds — Σgaps telescopes to the span, so moments stay in
    int64); the final correlation is IEEE-order-matched."""
    import math

    ds = _read(sf_dir, "events", columns=["user_id", "ts", "event_id"])

    def derive(t: pa.Table) -> pa.Table:
        u = t.column("user_id").to_numpy().astype(np.int64)
        return pa.table({
            "u": pa.array(u), "ts_us": t.column("ts").cast(pa.int64()),
            "event_id": t.column("event_id"),
            "bucket": pa.array((u % 64).astype(np.int32))})

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        u = g["u"].to_numpy(np.int64)
        ts = g["ts_us"].to_numpy(np.int64)
        e = g["event_id"].to_numpy(np.int64)
        order = np.lexsort((e, ts, u))
        us, tss = u[order], ts[order]
        same = us[1:] == us[:-1]
        gap = (tss[1:] - tss[:-1]) // 1_000_000
        # consecutive gap pairs within the same user
        pair_ok = same[1:] & same[:-1]
        x = gap[:-1][pair_ok]
        y = gap[1:][pair_ok]
        return pd.DataFrame({
            "n": [len(x)], "sx": [int(x.sum())], "sy": [int(y.sum())],
            "sxx": [int((x * x).sum())], "syy": [int((y * y).sum())],
            "sxy": [int((x * y).sum())]})

    m = (ds.map_batches(derive, batch_format="pyarrow")
         .groupby("bucket").map_groups(fold, batch_format="pandas")
         .to_pandas().sum())
    n, sx, sy = int(m["n"]), int(m["sx"]), int(m["sy"])
    sxx, syy, sxy = int(m["sxx"]), int(m["syy"]), int(m["sxy"])
    num = n * sxy - sx * sy
    d1 = n * sxx - sx * sx
    d2 = n * syy - sy * sy
    val = math.floor(float(num)
                     / (math.sqrt(float(d1)) * math.sqrt(float(d2)))
                     * 1000)
    return pd.DataFrame([(n, val)],
                        columns=["n_pairs", "gap_corr_milli"]) \
        .astype("int64")


def user_minute_burst_flags(sf_dir: str) -> pd.DataFrame:
    """BOT-DETECTION tripwire: users classed by their maximum events
    in any single minute (1 / 2–4 / 5–9 / 10+) — humans cluster low,
    scripted traffic saturates minutes. One ``user % 64`` bucket
    exchange; the fold packs (user, minute), counts, and takes the
    per-user max via one reduceat — 4 counter rows per bucket."""
    ds = _read(sf_dir, "events", columns=["user_id", "ts"])

    def derive(t: pa.Table) -> pa.Table:
        u = t.column("user_id").to_numpy().astype(np.int64)
        mi = t.column("ts").cast(pa.int64()).to_numpy() // 60_000_000
        return pa.table({"u": pa.array(u), "mi": pa.array(mi),
                         "bucket": pa.array((u % 64).astype(np.int32))})

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        u = g["u"].to_numpy(np.int64)
        mi = g["mi"].to_numpy(np.int64)
        pack = u * (1 << 26) + (mi & ((1 << 26) - 1))
        up, cnt = np.unique(pack, return_counts=True)
        uu = up >> 26
        starts = np.flatnonzero(np.r_[True, uu[1:] != uu[:-1]])
        mx = np.maximum.reduceat(cnt, starts)
        cls = np.where(mx == 1, 0,
                       np.where(mx <= 4, 1,
                                np.where(mx <= 9, 2, 3)))
        return pd.DataFrame({
            "cls": np.arange(4, dtype=np.int64),
            "n_users": np.bincount(cls, minlength=4)
            .astype(np.int64)})

    parts = (ds.map_batches(derive, batch_format="pyarrow")
             .groupby("bucket").map_groups(fold, batch_format="pandas")
             .to_pandas())
    agg = (parts.groupby("cls", as_index=False)["n_users"].sum()
           .sort_values("cls", kind="mergesort").reset_index(drop=True))
    agg = agg[agg["n_users"] > 0].reset_index(drop=True)
    return agg.rename(columns={"cls": "burst_class"}).astype("int64")


def events_round_number_bias(sf_dir: str) -> pd.DataFrame:
    """HEAPING detector: the share of values landing exactly on
    whole-dollar and half-dollar points, with the lift over the 1%/2%
    a cents-uniform process would produce — the manual-entry / fraud
    fingerprint Benford's law misses. Pure per-block counters — ZERO
    shuffle."""
    ds = _read(sf_dir, "events", columns=["value"])

    def partial(t: pa.Table) -> pa.Table:
        cents = np.floor(t.column("value").to_numpy() * 100) \
            .astype(np.int64)
        return pa.table({
            "n": pa.array([len(cents)], type=pa.int64()),
            "whole": pa.array([int((cents % 100 == 0).sum())],
                              type=pa.int64()),
            "half": pa.array([int((cents % 50 == 0).sum())],
                             type=pa.int64())})

    m = ds.map_batches(partial, batch_format="pyarrow").to_pandas().sum()
    n, whole, half = int(m["n"]), int(m["whole"]), int(m["half"])
    # lift = observed/expected as integer percent (expected: 1% of
    # cents land on .00, 2% on .00/.50 under a cents-uniform process)
    return pd.DataFrame(
        [("half_dollar", half, 10_000 * half // n, 5_000 * half // n),
         ("whole_dollar", whole, 10_000 * whole // n,
          10_000 * whole // n)],
        columns=["point", "n_hits", "share_bps", "lift_pct"]) \
        .astype({"n_hits": "int64", "share_bps": "int64",
                 "lift_pct": "int64"})


def user_tenure_value_curve(sf_dir: str, cap_weeks: int = 52) -> \
        pd.DataFrame:
    """Value-by-TENURE curve: per user-tenure week (weeks since the
    user's first event, capped), how many users were active and how
    much value they produced — 'does spend grow as users age', exact
    cents. One ``user % 64`` bucket exchange; the fold takes each
    user's first day from segment heads and bins every event by its
    tenure — ≤ cap+1 partial rows per bucket."""
    ds = _read(sf_dir, "events", columns=["user_id", "ts", "value"])

    def derive(t: pa.Table) -> pa.Table:
        u = t.column("user_id").to_numpy().astype(np.int64)
        d = t.column("ts").cast(pa.int64()).to_numpy() // 86_400_000_000
        cents = np.floor(t.column("value").to_numpy() * 100) \
            .astype(np.int64)
        return pa.table({"u": pa.array(u), "d": pa.array(d),
                         "cents": pa.array(cents),
                         "bucket": pa.array((u % 64).astype(np.int32))})

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        u = g["u"].to_numpy(np.int64)
        d = g["d"].to_numpy(np.int64)
        c = g["cents"].to_numpy(np.int64)
        order = np.lexsort((d, u))
        us, dsr, cs = u[order], d[order], c[order]
        starts = np.flatnonzero(np.r_[True, us[1:] != us[:-1]])
        f0 = np.repeat(dsr[starts], np.diff(np.r_[starts, len(us)]))
        tw = np.minimum((dsr - f0) // 7, cap_weeks)
        # distinct active users per tenure week: dedupe (user, week)
        pair = np.unique(us * (cap_weeks + 1) + tw)
        return pd.DataFrame({
            "tenure_week": np.arange(cap_weeks + 1, dtype=np.int64),
            "n_user_weeks": np.bincount(
                (pair % (cap_weeks + 1)).astype(np.int64),
                minlength=cap_weeks + 1).astype(np.int64),
            "sum_cents": np.bincount(tw, weights=cs,
                                     minlength=cap_weeks + 1)
            .astype(np.int64)})

    parts = (ds.map_batches(derive, batch_format="pyarrow")
             .groupby("bucket").map_groups(fold, batch_format="pandas")
             .to_pandas())
    agg = (parts.groupby("tenure_week", as_index=False).sum()
           .sort_values("tenure_week", kind="mergesort")
           .reset_index(drop=True))
    return agg[agg["n_user_weeks"] > 0].reset_index(drop=True) \
        .astype("int64")


def bloom_fpr_audit(sf_dir: str, n_hashes: int = 3) -> pd.DataFrame:
    """BLOOM-FILTER calibration: build the double-hashing filter
    (positions ``(h1 + i·h2) mod m``, md5 halves as the two hashes —
    fully SQL-reproducible) over the part keys at 8 and 16 bits/key,
    probe it with the deterministic non-member run
    ``max_key+1 .. max_key+n`` and report the MEASURED false-positive
    rate in bps — the table that says whether the semi-join prefilter
    (``big_order_lines_bloom``) is sized right before 100 TB trusts
    it. The key set is the dimension side (driver bitset build, the
    documented finish); probes and members share one vectorized
    position kernel."""
    import hashlib

    ds = _read(sf_dir, "part", columns=["p_partkey"])
    keys = np.unique(ds.to_pandas()["p_partkey"].to_numpy(np.int64))
    nk = len(keys)
    mk = int(keys.max())
    probes = np.arange(mk + 1, mk + nk + 1, dtype=np.int64)

    def halves(vals: np.ndarray) -> tuple:
        h1 = np.empty(len(vals), dtype=np.uint64)
        h2 = np.empty(len(vals), dtype=np.uint64)
        for i, v in enumerate(vals):
            hx = hashlib.md5(str(int(v)).encode()).hexdigest()
            h1[i] = int(hx[:16], 16)
            h2[i] = int(hx[16:32], 16)
        return h1, h2

    k1, k2 = halves(keys)
    p1, p2 = halves(probes)
    rows = []
    for bpk in (8, 16):
        m = np.uint64(bpk * nk)
        bits = np.zeros(int(m), dtype=bool)
        for i in range(n_hashes):
            bits[((k1 % m) + np.uint64(i) * (k2 % m)) % m] = True
        fp = np.ones(len(probes), dtype=bool)
        for i in range(n_hashes):
            fp &= bits[((p1 % m) + np.uint64(i) * (p2 % m)) % m]
        nfp = int(fp.sum())
        rows.append((bpk, nk, len(probes), nfp,
                     10_000 * nfp // len(probes)))
    return pd.DataFrame(rows, columns=[
        "bits_per_key", "n_keys", "n_probes", "n_false_pos",
        "fpr_bps"]).astype("int64")


def part_price_dispersion(sf_dir: str) -> pd.DataFrame:
    """Procurement-arbitrage audit: per part, the spread between its
    highest and lowest observed UNIT price (truncating
    ``cents // qty`` on both sides), binned into dispersion bands —
    parts in the top band are where a buyer renegotiates. One
    ``part % 64`` bucket exchange; ≤ 4 band counters per bucket."""
    ds = _read(sf_dir, "lineitem",
               columns=["l_partkey", "l_extendedprice", "l_quantity"])

    def derive(t: pa.Table) -> pa.Table:
        k = t.column("l_partkey").to_numpy().astype(np.int64)
        unit = (np.floor(t.column("l_extendedprice").to_numpy() * 100)
                .astype(np.int64)
                // t.column("l_quantity").to_numpy().astype(np.int64))
        return pa.table({"k": pa.array(k), "u": pa.array(unit),
                         "bucket": pa.array((k % 64).astype(np.int32))})

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        k = g["k"].to_numpy(np.int64)
        u = g["u"].to_numpy(np.int64)
        order = np.lexsort((u, k))
        ks, us = k[order], u[order]
        starts = np.flatnonzero(np.r_[True, ks[1:] != ks[:-1]])
        ends = np.r_[starts[1:], len(ks)]
        disp = us[ends - 1] - us[starts]
        band = np.where(disp == 0, 0,
                        np.where(disp < 100, 1,
                                 np.where(disp < 1000, 2, 3)))
        return pd.DataFrame({
            "band": np.arange(4, dtype=np.int64),
            "n_parts": np.bincount(band, minlength=4)
            .astype(np.int64),
            "sum_disp_cents": np.bincount(band, weights=disp,
                                          minlength=4)
            .astype(np.int64)})

    parts = (ds.map_batches(derive, batch_format="pyarrow")
             .groupby("bucket").map_groups(fold, batch_format="pandas")
             .to_pandas())
    agg = (parts.groupby("band", as_index=False).sum()
           .sort_values("band", kind="mergesort").reset_index(drop=True))
    return agg[agg["n_parts"] > 0].reset_index(drop=True) \
        .astype("int64")


def hte_by_decile(sf_dir: str) -> pd.DataFrame:
    """HETEROGENEOUS-treatment-effect harness: users mock-assigned to
    arms by id parity (as in ``events_cuped_adjust``), sliced by their
    PRE-period value decile (exact NTILE rule over per-user pre sums),
    and per decile the two arms' post-period purchase-conversion rates
    and their gap in bps — the segment-level readout an experimentation
    platform prints under every A/B test. Pass 1 bounds the window;
    pass 2 is one ``user % 64`` exchange folding per-user (pre-cents,
    converted) rows; deciles rank the per-user table (user-cardinality,
    the documented dimension-sized driver finish — at 100 TB the rank
    becomes the distributed NTILE already implemented in
    ``events_ntile``)."""
    ds = _read(sf_dir, "events",
               columns=["user_id", "ts", "value", "event_type"])

    def minmax(t: pa.Table) -> pa.Table:
        d = t.column("ts").cast(pa.int64()).to_numpy() // 86_400_000_000
        return pa.table({"mn": pa.array([int(d.min())]),
                         "mx": pa.array([int(d.max())])})

    mm = ds.map_batches(minmax, batch_format="pyarrow").to_pandas()
    mid = (int(mm["mn"].min()) + int(mm["mx"].max()) + 1) // 2

    def derive(t: pa.Table) -> pa.Table:
        u = t.column("user_id").to_numpy().astype(np.int64)
        d = t.column("ts").cast(pa.int64()).to_numpy() // 86_400_000_000
        cents = np.floor(t.column("value").to_numpy() * 100) \
            .astype(np.int64)
        isp = (np.asarray(t.column("event_type")) == "purchase")
        return pa.table({
            "u": pa.array(u),
            "pre": pa.array(np.where(d < mid, cents, 0)),
            "conv": pa.array((isp & (d >= mid)).astype(np.int8)),
            "bucket": pa.array((u % 64).astype(np.int32))})

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        u = g["u"].to_numpy(np.int64)
        uu, inv = np.unique(u, return_inverse=True)
        return pd.DataFrame({
            "u": uu,
            "pre": np.bincount(inv, weights=g["pre"].to_numpy(np.int64),
                               minlength=len(uu)).astype(np.int64),
            "conv": (np.bincount(inv,
                                 weights=g["conv"].to_numpy(np.int8),
                                 minlength=len(uu)) > 0)
            .astype(np.int64)})

    per_user = (ds.map_batches(derive, batch_format="pyarrow")
                .groupby("bucket").map_groups(fold,
                                              batch_format="pandas")
                .to_pandas())
    u = per_user["u"].to_numpy(np.int64)
    pre = per_user["pre"].to_numpy(np.int64)
    conv = per_user["conv"].to_numpy(np.int64)
    n = len(u)
    order = np.lexsort((u, pre))
    dec = np.empty(n, dtype=np.int64)
    dec[order] = 10 * np.arange(n, dtype=np.int64) // n
    arm = u % 2
    rows = []
    for d_ in range(10):
        m = dec == d_
        r = [d_]
        for a in (0, 1):
            ma = m & (arm == a)
            na = int(ma.sum())
            ca = int(conv[ma].sum())
            r += [na, 10_000 * ca // na if na else 0]
        rows.append((*r, r[4] - r[2]))
    return pd.DataFrame(rows, columns=[
        "decile", "n_arm0", "conv0_bps", "n_arm1", "conv1_bps",
        "lift_bps"]).astype("int64")


def part_stock_clamp(sf_dir: str) -> pd.DataFrame:
    """CLAMPED-inventory fold: per part, returned lines (``l_returnflag
    = 'R'``) are restocks (+qty) and all other lines are shipments
    (−qty), netted per day; the stock level starting from 0 follows the
    non-linear recurrence ``s_t = max(0, s_{t-1} + net_t)`` — which has
    the exact closed form ``s_t = P_t − min(0, running_min(P_t))`` over
    prefix sums, so a stateful simulator becomes one vectorized
    segment pass AND an exact SQL window twin. Output: parts banded by
    stockout-day count with lost (clamped-away) and ending units — the
    inventory-health table a supply planner reads. One ``part % 64``
    exchange; per-bucket fold is lexsort + pandas C-level grouped
    cumsum/cummin; the driver sees 4-band partials per bucket."""
    ds = _read(sf_dir, "lineitem",
               columns=["l_partkey", "l_shipdate", "l_quantity",
                        "l_returnflag"])

    def derive(t: pa.Table) -> pa.Table:
        p = t.column("l_partkey").to_numpy()
        dy = t.column("l_shipdate").cast(pa.int64()).to_numpy() \
            // 86_400_000_000
        q = t.column("l_quantity").to_numpy().astype(np.int64)
        r = np.asarray(t.column("l_returnflag")) == "R"
        return pa.table({
            "p": pa.array(p), "dy": pa.array(dy),
            "net": pa.array(np.where(r, q, -q)),
            "bucket": pa.array((p % 64).astype(np.int32))})

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        p = g["p"].to_numpy(np.int64)
        dy = g["dy"].to_numpy(np.int64)
        net = g["net"].to_numpy(np.int64)
        order = np.lexsort((dy, p))
        p, dy, net = p[order], dy[order], net[order]
        brk = np.empty(len(p), bool)
        brk[0] = True
        brk[1:] = (p[1:] != p[:-1]) | (dy[1:] != dy[:-1])
        gid = np.cumsum(brk) - 1
        net = np.bincount(gid, weights=net).astype(np.int64)
        p = p[brk]
        pser = pd.Series(p)
        ps = pd.Series(net).groupby(pser, sort=False).cumsum() \
            .to_numpy(np.int64)
        mn = pd.Series(ps).groupby(pser, sort=False).cummin() \
            .to_numpy(np.int64)
        stock = ps - np.minimum(mn, 0)
        pbrk = np.empty(len(p), bool)
        pbrk[0] = True
        pbrk[1:] = p[1:] != p[:-1]
        pid = np.cumsum(pbrk) - 1
        last = np.flatnonzero(np.append(pbrk[1:], True))
        zd = np.bincount(pid, weights=(stock == 0)).astype(np.int64)
        lost = -np.minimum(mn[last], 0)
        fin = ps[last] - np.minimum(mn[last], 0)
        band = np.searchsorted(np.array([1, 3, 6]), zd, side="right")
        return pd.DataFrame({
            "band": band.astype(np.int64),
            "n_parts": np.ones(len(zd), np.int64),
            "stockout_days": zd, "lost_units": lost,
            "end_units": fin})

    parts = (ds.map_batches(derive, batch_format="pyarrow")
             .groupby("bucket").map_groups(fold, batch_format="pandas")
             .to_pandas())
    agg = (parts.groupby("band", as_index=False)
           .agg(n_parts=("n_parts", "sum"),
                stockout_days=("stockout_days", "sum"),
                lost_units=("lost_units", "sum"),
                end_units=("end_units", "sum"))
           .sort_values("band", kind="mergesort").reset_index(drop=True))
    return agg[agg["n_parts"] > 0].reset_index(drop=True).astype("int64")


def score_auc_audit(sf_dir: str) -> pd.DataFrame:
    """EXACT tie-aware AUC / Gini for a mock scoring model: score =
    value-cents mod 512 (512 discrete levels force heavy ties — the
    hard case for rank-based AUC), label = purchase. AUC is computed
    from the grouped rank-sum identity 2·AUC·n₊·n₋ = Σ_s p_s·(2·Q_<s +
    q_s) over score levels — pure integers end to end, so the DuckDB
    window twin matches bit-for-bit. Each block emits a fixed 512-level
    (pos, neg) histogram partial; NO exchange at any scale — the driver
    folds |blocks| × 512 counter rows."""
    ds = _read(sf_dir, "events", columns=["value", "event_type"])

    def partial(t: pa.Table) -> pa.Table:
        cents = np.floor(t.column("value").to_numpy() * 100) \
            .astype(np.int64)
        s = cents % 512
        y = np.asarray(t.column("event_type")) == "purchase"
        return pa.table({
            "s": pa.array(np.arange(512, dtype=np.int64)),
            "p": pa.array(np.bincount(s[y], minlength=512)
                          .astype(np.int64)),
            "q": pa.array(np.bincount(s[~y], minlength=512)
                          .astype(np.int64))})

    h = (ds.map_batches(partial, batch_format="pyarrow").to_pandas()
         .groupby("s", as_index=False).sum().sort_values("s"))
    p = h["p"].to_numpy(np.int64)
    q = h["q"].to_numpy(np.int64)
    cq = np.concatenate(([0], np.cumsum(q)[:-1]))
    num2 = int((p * (2 * cq + q)).sum())
    n_pos, n_neg = int(p.sum()), int(q.sum())
    auc_bps = 10_000 * num2 // (2 * n_pos * n_neg)
    gini_bps = 20_000 * num2 // (2 * n_pos * n_neg) - 10_000
    return pd.DataFrame(
        [(n_pos, n_neg, auc_bps, gini_bps)],
        columns=["n_pos", "n_neg", "auc_bps", "gini_bps"]) \
        .astype("int64")


def blocking_key_audit(sf_dir: str) -> pd.DataFrame:
    """RECORD-LINKAGE blocking quality: for three candidate blocking
    strategies over customers — (0) nation, (1) account-balance band,
    (2) segment × nation — measure block count, largest block, the
    candidate-pair count Σ c·(c−1)/2 a pairwise matcher would score,
    and the reduction ratio vs all-pairs in bps: the table that
    decides which blocking key makes a dedup/linkage pass tractable.
    Per-batch ``np.unique`` partials → one small grouped sum (block
    cardinality ≤ a few hundred); the driver folds per-strategy
    integers. Pair counts are exact integers at any scale."""
    from ..functions.hashing import hash64_many

    ds = _read(sf_dir, "customer",
               columns=["c_nationkey", "c_acctbal", "c_mktsegment"])

    def partial(t: pa.Table) -> pa.Table:
        nat = t.column("c_nationkey").to_numpy().astype(np.int64)
        cents = np.floor(t.column("c_acctbal").to_numpy() * 100) \
            .astype(np.int64)
        band = (cents + 100_000) // 100_000
        seg = np.asarray(t.column("c_mktsegment"), dtype=object)
        k2 = hash64_many(
            [f"{s}|{n}" for s, n in zip(seg, nat)]).astype(np.int64)
        strat = np.concatenate([
            np.zeros(len(nat), np.int64),
            np.ones(len(nat), np.int64),
            np.full(len(nat), 2, np.int64)])
        key = np.concatenate([nat, band, k2])
        pk = np.stack([strat, key], axis=1)
        uq, cnt = np.unique(pk, axis=0, return_counts=True)
        return pa.table({"strat": pa.array(uq[:, 0]),
                         "key": pa.array(uq[:, 1]),
                         "n": pa.array(cnt.astype(np.int64))})

    blocks = (ds.map_batches(partial, batch_format="pyarrow")
              .groupby(["strat", "key"])
              .aggregate(Sum("n", alias_name="n")).to_pandas())
    rows = []
    n_tot = int(blocks[blocks["strat"] == 0]["n"].sum())
    total_pairs = n_tot * (n_tot - 1) // 2
    for s in (0, 1, 2):
        c = blocks[blocks["strat"] == s]["n"].to_numpy(np.int64)
        cand = int((c * (c - 1) // 2).sum())
        rows.append((s, len(c), int(c.max()), cand,
                     10_000 * (total_pairs - cand) // total_pairs))
    return pd.DataFrame(rows, columns=[
        "strategy", "n_blocks", "max_block", "cand_pairs",
        "reduction_bps"]).astype("int64")


def ldiversity_audit(sf_dir: str) -> pd.DataFrame:
    """L-DIVERSITY privacy audit (the sibling of
    ``events_kanon_audit``): quasi-identifier groups are (order
    priority, order month); the sensitive attribute is order status.
    For each group count the DISTINCT sensitive values l, then report
    per l-class how many groups and rows sit there and each class's
    row share in bps — groups with l = 1 leak their members' status
    outright. One direct grouped count over (priority, month, status)
    (cardinality ≤ |priorities|·|months|·|statuses|, dimension-sized
    at any scale); the driver folds the distinct-status rollup."""
    ds = _read(sf_dir, "orders",
               columns=["o_orderpriority", "o_orderdate",
                        "o_orderstatus"])

    def derive(t: pa.Table) -> pa.Table:
        mo = t.column("o_orderdate").to_numpy() \
            .astype("datetime64[M]").astype(np.int64)
        return pa.table({"pr": t.column("o_orderpriority"),
                         "mo": pa.array(mo),
                         "st": t.column("o_orderstatus")})

    g = (ds.map_batches(derive, batch_format="pyarrow")
         .groupby(["pr", "mo", "st"])
         .aggregate(Count(alias_name="n")).to_pandas())
    q = (g.groupby(["pr", "mo"], as_index=False)
         .agg(ld=("st", "size"), rows=("n", "sum")))
    tot = int(q["rows"].sum())
    out = (q.groupby("ld", as_index=False)
           .agg(n_groups=("ld", "size"), n_rows=("rows", "sum"))
           .sort_values("ld").reset_index(drop=True))
    out["rows_share_bps"] = (10_000 * out["n_rows"]) // tot
    out = out.rename(columns={"ld": "l_distinct"})
    return out.astype("int64")


def fdr_bh_audit(sf_dir: str) -> pd.DataFrame:
    """BENJAMINI-HOCHBERG multiple-testing audit: one p-value per user
    (md5-derived, uniform on [0,1e6) except every 10th user carries a
    20× smaller "signal" p — the planted-discovery mix), then the BH
    step-up rule at q = 1%/5%/10%: reject the largest rank r with
    p_(r)·m ≤ r·q, all in integers (p in 1e-6 units, q in ppm) so the
    SQL window twin matches exactly. Distinct users fold through one
    ``user % 64`` exchange; the ranked BH scan runs on the
    user-cardinality p list (the documented dimension-sized driver
    finish — at 100 TB the scan becomes a distributed sort + segmented
    max, same shape as ``events_ntile``)."""
    from ..functions.hashing import hash64_many

    ds = _read(sf_dir, "events", columns=["user_id"])

    def uniq(t: pa.Table) -> pa.Table:
        u = np.unique(t.column("user_id").to_numpy().astype(np.int64))
        return pa.table({"u": pa.array(u),
                         "bucket": pa.array((u % 64).astype(np.int32))})

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"u": np.unique(g["u"].to_numpy(np.int64))})

    users = (ds.map_batches(uniq, batch_format="pyarrow")
             .groupby("bucket").map_groups(fold, batch_format="pandas")
             .to_pandas()["u"].to_numpy(np.int64))
    h = (hash64_many([str(int(x)) for x in users]).astype(np.int64)
         .view(np.uint64) % 1_000_000).astype(np.int64)
    pm = np.where(users % 10 == 0, h // 20, h)
    order = np.lexsort((users, pm))
    pm_s = pm[order]
    m = len(pm_s)
    rk = np.arange(1, m + 1, dtype=np.int64)
    rows = []
    for q in (10_000, 50_000, 100_000):
        ok = pm_s * m <= rk * q
        k = int(rk[ok].max()) if ok.any() else 0
        thr = int(pm_s[k - 1]) if k > 0 else -1
        rows.append((q, m, k, thr))
    return pd.DataFrame(rows, columns=[
        "q_ppm", "m_tests", "k_rejected", "p_thresh_micro"]) \
        .astype("int64")


def discount_emd_by_year(sf_dir: str) -> pd.DataFrame:
    """DISTRIBUTION-DRIFT in earth-mover units: the exact 1-D EMD
    (Wasserstein-1) between consecutive ship-years' discount
    distributions over the 11 discrete discount levels — Σ over the
    level grid of |CDF₁ − CDF₂|, kept exact by cross-multiplying the
    two years' counts (|cum₁·n₂ − cum₂·n₁| summed, then one floor
    division), in milli-discount-points. The grouped (year, level)
    counts are a ≤ |years|·11 table (a direct grouped count at any
    scale); the CDF grid and pairing run on the driver."""
    ds = _read(sf_dir, "lineitem", columns=["l_shipdate", "l_discount"])

    def derive(t: pa.Table) -> pa.Table:
        y = t.column("l_shipdate").to_numpy() \
            .astype("datetime64[Y]").astype(np.int64) + 1970
        lv = np.floor(t.column("l_discount").to_numpy() * 100 + 0.5) \
            .astype(np.int64)
        return pa.table({"y": pa.array(y), "lv": pa.array(lv)})

    g = (ds.map_batches(derive, batch_format="pyarrow")
         .groupby(["y", "lv"]).aggregate(Count(alias_name="n"))
         .to_pandas())
    years = np.sort(g["y"].unique())
    grid = np.zeros((len(years), 11), np.int64)
    yi = {int(y): i for i, y in enumerate(years)}
    for _, r in g.iterrows():
        grid[yi[int(r["y"])], int(r["lv"])] = int(r["n"])
    cum = np.cumsum(grid, axis=1)
    n = grid.sum(axis=1)
    rows = []
    for i in range(len(years) - 1):
        diff = np.abs(cum[i].astype(object) * int(n[i + 1])
                      - cum[i + 1].astype(object) * int(n[i]))[:-1]
        emd = 1000 * int(diff.sum()) // (int(n[i]) * int(n[i + 1]))
        rows.append((int(years[i]), int(years[i + 1]), int(n[i]),
                     int(n[i + 1]), emd))
    return pd.DataFrame(rows, columns=[
        "y1", "y2", "n1", "n2", "emd_millipoints"]).astype("int64")


def fd_violation_audit(sf_dir: str) -> pd.DataFrame:
    """FUNCTIONAL-DEPENDENCY discovery audit (the schema-quality
    sibling of ``fk_orphan_audit``): for four candidate FDs —
    custkey→priority and month→status on orders, orderkey→suppkey and
    partkey→suppkey on lineitem — count the left-hand-side groups, the
    groups where the right side is NOT unique, and the total violation
    mass Σ(distinct_rhs − 1); an FD "holds" iff that sum is 0. Each FD
    is the two-stage distinct-pair shuffle from
    ``users_per_event_type``: map-side ``np.unique`` on packed
    (lhs, rhs) codes, one pair exchange, then a lhs-cardinality
    rollup folded to four counters — no raw rows cross the wire."""
    from ..functions.hashing import hash64_many

    def fd_counts(ds, pack_fn) -> tuple[int, int, int]:
        def pairs(t: pa.Table) -> pa.Table:
            k = pack_fn(t)
            k = np.unique(k, axis=0)
            return pa.table({
                "lhs": pa.array(k[:, 0]), "rhs": pa.array(k[:, 1]),
                "bucket": pa.array((k[:, 0] % 64).astype(np.int32))})

        def fold(g: pd.DataFrame) -> pd.DataFrame:
            k = np.stack([g["lhs"].to_numpy(np.int64),
                          g["rhs"].to_numpy(np.int64)], axis=1)
            k = np.unique(k, axis=0)
            lhs, cnt = np.unique(k[:, 0], return_counts=True)
            return pd.DataFrame({
                "n_lhs": [len(lhs)],
                "n_viol_groups": [int((cnt > 1).sum())],
                "violations": [int((cnt - 1).sum())]})

        m = (ds.map_batches(pairs, batch_format="pyarrow")
             .groupby("bucket").map_groups(fold, batch_format="pandas")
             .to_pandas().sum())
        return (int(m["n_lhs"]), int(m["n_viol_groups"]),
                int(m["violations"]))

    orders = _read(sf_dir, "orders",
                   columns=["o_custkey", "o_orderpriority",
                            "o_orderdate", "o_orderstatus"])
    li = _read(sf_dir, "lineitem",
               columns=["l_orderkey", "l_partkey", "l_suppkey"])

    def pk_cust_prio(t):
        c = t.column("o_custkey").to_numpy().astype(np.int64)
        pr = hash64_many(np.asarray(t.column("o_orderpriority"),
                                    dtype=object)).astype(np.int64)
        return np.stack([c, pr], axis=1)

    def pk_month_status(t):
        mo = t.column("o_orderdate").to_numpy() \
            .astype("datetime64[M]").astype(np.int64)
        st = hash64_many(np.asarray(t.column("o_orderstatus"),
                                    dtype=object)).astype(np.int64)
        return np.stack([mo, st], axis=1)

    def pk_order_supp(t):
        return np.stack([t.column("l_orderkey").to_numpy()
                         .astype(np.int64),
                         t.column("l_suppkey").to_numpy()
                         .astype(np.int64)], axis=1)

    def pk_part_supp(t):
        return np.stack([t.column("l_partkey").to_numpy()
                         .astype(np.int64),
                         t.column("l_suppkey").to_numpy()
                         .astype(np.int64)], axis=1)

    rows = []
    for fid, (ds, fn) in enumerate([
            (orders, pk_cust_prio), (orders, pk_month_status),
            (li, pk_order_supp), (li, pk_part_supp)]):
        n_lhs, nv, v = fd_counts(ds, fn)
        rows.append((fid, n_lhs, nv, v, int(v == 0)))
    return pd.DataFrame(rows, columns=[
        "fd_id", "n_lhs_groups", "n_viol_groups", "violations",
        "holds"]).astype("int64")


def user_decayed_value(sf_dir: str) -> pd.DataFrame:
    """RECENCY-DECAYED customer value: every event's cents are halved
    for each 4 days of age relative to the corpus' last day (exact
    power-of-two decay, ``cents // (1 << (days_ago // 4))`` — integer
    on both sides, no float drift), summed per user, then users are
    banded by decayed value — the freshness-weighted LTV a
    re-engagement campaign ranks on. Pass 1 bounds the window (one
    max per block); pass 2 folds per-user sums through one
    ``user % 64`` exchange and emits 4-band partials."""
    ds = _read(sf_dir, "events", columns=["user_id", "ts", "value"])

    def mx(t: pa.Table) -> pa.Table:
        d = t.column("ts").cast(pa.int64()).to_numpy() // 86_400_000_000
        return pa.table({"mx": pa.array([int(d.max())])})

    last = int(ds.map_batches(mx, batch_format="pyarrow")
               .to_pandas()["mx"].max())

    def derive(t: pa.Table) -> pa.Table:
        u = t.column("user_id").to_numpy().astype(np.int64)
        d = t.column("ts").cast(pa.int64()).to_numpy() // 86_400_000_000
        cents = np.floor(t.column("value").to_numpy() * 100) \
            .astype(np.int64)
        sh = np.minimum((last - d) // 4, 40)
        dec = cents // (np.int64(1) << sh)
        return pa.table({"u": pa.array(u), "dv": pa.array(dec),
                         "bucket": pa.array((u % 64).astype(np.int32))})

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        u = g["u"].to_numpy(np.int64)
        uu, inv = np.unique(u, return_inverse=True)
        dv = np.bincount(inv, weights=g["dv"].to_numpy(np.int64),
                         minlength=len(uu)).astype(np.int64)
        band = np.searchsorted(np.array([50_000, 75_000, 100_000]),
                               dv, side="right")
        return pd.DataFrame({
            "band": band.astype(np.int64),
            "n_users": np.ones(len(uu), np.int64),
            "sum_decayed_cents": dv})

    agg = (ds.map_batches(derive, batch_format="pyarrow")
           .groupby("bucket").map_groups(fold, batch_format="pandas")
           .to_pandas().groupby("band", as_index=False)
           .agg(n_users=("n_users", "sum"),
                sum_decayed_cents=("sum_decayed_cents", "sum"))
           .sort_values("band").reset_index(drop=True))
    return agg[agg["n_users"] > 0].reset_index(drop=True) \
        .astype("int64")


def part_name_collision_audit(sf_dir: str) -> pd.DataFrame:
    """ENTITY-NAME ambiguity audit: parts sharing the same display name
    are what a naive name-keyed entity resolution would wrongly merge —
    count the collision-group sizes and the share of parts whose name
    is ambiguous, banded by group size (1 / 2 / 3-4 / 5+). Map-side
    ``np.unique`` per batch on md5 name codes → one grouped sum on the
    name-cardinality table (names never shuffle as strings) → 4-band
    rollup. The data-quality gate before ``name_edit_near_pairs``-style
    fuzzy matching."""
    from ..functions.hashing import hash64_many

    ds = _read(sf_dir, "part", columns=["p_name"])

    def partial(t: pa.Table) -> pa.Table:
        h = hash64_many(np.asarray(t.column("p_name"), dtype=object)) \
            .astype(np.int64)
        u, c = np.unique(h, return_counts=True)
        return pa.table({"h": pa.array(u),
                         "n": pa.array(c.astype(np.int64))})

    g = (ds.map_batches(partial, batch_format="pyarrow")
         .groupby("h").aggregate(Sum("n", alias_name="n")).to_pandas())
    c = g["n"].to_numpy(np.int64)
    band = np.searchsorted(np.array([2, 3, 5]), c, side="right")
    rows = []
    tot = int(c.sum())
    for b in range(4):
        m = band == b
        rows.append((b, int(m.sum()), int(c[m].sum()),
                     10_000 * int(c[m].sum()) // tot))
    out = pd.DataFrame(rows, columns=[
        "band", "n_names", "n_parts", "parts_share_bps"])
    return out[out["n_names"] > 0].reset_index(drop=True) \
        .astype("int64")


def supplier_return_wilson(sf_dir: str) -> pd.DataFrame:
    """RETURN-RATE risk ranking with a Wilson 95% LOWER confidence
    bound — the small-sample-safe way to rank suppliers by how bad
    their return rate provably is (a raw rate ranks a 1-for-1 supplier
    above a 99-for-200 one; Wilson does not). Counts fold in one
    direct grouped aggregate (supplier-cardinality, dimension-sized);
    the bound is the ONE final float expression, written with the
    identical operation order in numpy and SQL (the house
    IEEE-order-matching rule), floored to micro units. Top 20 by
    bound, suppkey tie-break."""
    import math

    ds = _read(sf_dir, "lineitem", columns=["l_suppkey",
                                            "l_returnflag"])

    def derive(t: pa.Table) -> pa.Table:
        s = t.column("l_suppkey").to_numpy().astype(np.int64)
        r = (np.asarray(t.column("l_returnflag")) == "R") \
            .astype(np.int64)
        return pa.table({"s": pa.array(s), "r": pa.array(r)})

    g = (ds.map_batches(derive, batch_format="pyarrow")
         .groupby("s").aggregate(Count(alias_name="n"),
                                 Sum("r", alias_name="k"))
         .to_pandas())
    n = g["n"].to_numpy(np.int64)
    k = g["k"].to_numpy(np.int64)
    wl = np.empty(len(n), np.int64)
    for i in range(len(n)):
        ni, ki = float(n[i]), float(k[i])
        ph = ki / ni
        z2 = 1.96 * 1.96
        w = ((ph + z2 / (2.0 * ni)
              - 1.96 * math.sqrt((ph * (1.0 - ph) + z2 / (4.0 * ni))
                                 / ni))
             / (1.0 + z2 / ni))
        wl[i] = math.floor(w * 1000000.0)
    g["ret_bps"] = (10_000 * g["k"]) // g["n"]
    g["wilson_lb_micro"] = wl
    out = (g.sort_values(["wilson_lb_micro", "s"],
                         ascending=[False, True], kind="mergesort")
           .head(20).reset_index(drop=True)
           .rename(columns={"s": "suppkey", "n": "n_lines",
                            "k": "n_returns"}))
    return out.astype("int64")


def priority_transition_matrix(sf_dir: str) -> pd.DataFrame:
    """ORDER-PRIORITY Markov matrix: for every customer's consecutive
    order pair (ordered by orderdate, orderkey tiebreak), count the
    from-priority → to-priority transitions and each row's share in
    bps — the "does urgency persist per account" question behind
    SLA staffing models. One ``custkey % 64`` exchange co-locates each
    customer's orders; per bucket a single lexsort + adjacent-pair
    mask emits a 25-cell bincount partial, so the driver only sums
    tiny grids (LEAD-rule twin)."""
    ds = _read(sf_dir, "orders",
               columns=["o_custkey", "o_orderdate",
                        "o_orderpriority", "o_orderkey"])

    def derive(t: pa.Table) -> pa.Table:
        c = t.column("o_custkey").to_numpy().astype(np.int64)
        return pa.table({
            "c": pa.array(c),
            "d": t.column("o_orderdate").cast(pa.int64()),
            "k": t.column("o_orderkey").cast(pa.int64()),
            "p": pa.array(np.array(
                [int(s[0]) - 1 for s in
                 np.asarray(t.column("o_orderpriority"),
                            dtype=object)], np.int64)),
            "bucket": pa.array((c % 64).astype(np.int32))})

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        c = g["c"].to_numpy(np.int64)
        d = g["d"].to_numpy(np.int64)
        k = g["k"].to_numpy(np.int64)
        p = g["p"].to_numpy(np.int64)
        order = np.lexsort((k, d, c))
        c, p = c[order], p[order]
        same = c[1:] == c[:-1]
        cell = 5 * p[:-1][same] + p[1:][same]
        return pd.DataFrame({
            "cell": np.arange(25, dtype=np.int64),
            "n": np.bincount(cell, minlength=25).astype(np.int64)})

    per = (ds.map_batches(derive, batch_format="pyarrow")
           .groupby("bucket").map_groups(fold, batch_format="pandas")
           .to_pandas().groupby("cell", as_index=False).sum())
    grid = np.zeros(25, np.int64)
    grid[per["cell"].to_numpy(np.int64)] = per["n"].to_numpy(np.int64)
    names = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED",
             "5-LOW"]
    rows = []
    for i in range(5):
        rt = int(grid[5 * i:5 * i + 5].sum())
        for j in range(5):
            n = int(grid[5 * i + j])
            if n > 0:
                rows.append((names[i], names[j], n, 10_000 * n // rt))
    return pd.DataFrame(rows, columns=[
        "from_p", "to_p", "n", "row_share_bps"]).astype(
        {"n": "int64", "row_share_bps": "int64"})


def kmv_set_ops_audit(sf_dir: str, k: int = 128) -> pd.DataFrame:
    """KMV SET-ALGEBRA audit — the sketch counterpart of
    ``users_click_and_purchase``: estimate |click users|, |purchase
    users|, their UNION and their INTERSECTION from bottom-k (k=128)
    60-bit md5 sketches and report each against the exact count in
    error bps. Union is the KMV merge (k smallest of the merged
    stream); intersection is the theta-sketch rule (both-flags count
    within the union's k smallest, scaled by the union estimate //
    k) — all in exact integer arithmetic, with the <k branches
    degrading to the exact counts so the SQL twin matches
    bit-for-bit. One ``hash % 64`` exchange folds per-user flag ORs;
    each bucket ships 4 count partials + ≤3k sketch rows."""
    from ..functions.hashing import hash64_many

    ds = _read(sf_dir, "events", columns=["user_id", "event_type"])

    def derive(t: pa.Table) -> pa.Table:
        et = np.asarray(t.column("event_type")).astype(object)
        uid = t.column("user_id").to_numpy()
        sel = (et == "click") | (et == "purchase")
        uid, et = uid[sel], et[sel]
        if not len(uid):
            return pa.table({"h": pa.array([], type=pa.int64()),
                             "a": pa.array([], type=pa.int8()),
                             "b": pa.array([], type=pa.int8()),
                             "bucket": pa.array([], type=pa.int32())})
        u, inv = np.unique(uid, return_inverse=True)
        h = (hash64_many([str(x) for x in u])
             >> np.uint64(4)).astype(np.int64)
        a = np.zeros(len(u), np.int8)
        b = np.zeros(len(u), np.int8)
        np.maximum.at(a, inv, (et == "click").astype(np.int8))
        np.maximum.at(b, inv, (et == "purchase").astype(np.int8))
        return pa.table({
            "h": pa.array(h), "a": pa.array(a), "b": pa.array(b),
            "bucket": pa.array(
                (h.view(np.uint64) % 64).astype(np.int32))})

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        h = g["h"].to_numpy(np.int64)
        a = g["a"].to_numpy(np.int8)
        b = g["b"].to_numpy(np.int8)
        order = np.argsort(h, kind="mergesort")
        h, a, b = h[order], a[order], b[order]
        brk = np.empty(len(h), bool)
        brk[0] = True
        brk[1:] = h[1:] != h[:-1]
        starts = np.flatnonzero(brk)
        hu = h[brk]
        au = np.maximum.reduceat(a, starts)
        bu = np.maximum.reduceat(b, starts)
        counts = pd.DataFrame({
            "kind": np.zeros(4, np.int8),
            "h": np.arange(4, dtype=np.int64),
            "a": np.zeros(4, np.int8), "b": np.zeros(4, np.int8),
            "v": np.array([au.sum(), bu.sum(),
                           (au & bu).sum(), len(hu)], np.int64)})
        keep = np.zeros(len(hu), bool)
        keep[:k] = True                      # union bottom-k
        keep[np.flatnonzero(au == 1)[:k]] = True
        keep[np.flatnonzero(bu == 1)[:k]] = True
        sk = pd.DataFrame({
            "kind": np.ones(int(keep.sum()), np.int8),
            "h": hu[keep], "a": au[keep], "b": bu[keep],
            "v": np.zeros(int(keep.sum()), np.int64)})
        return pd.concat([counts, sk], ignore_index=True)

    per = (ds.map_batches(derive, batch_format="pyarrow")
           .groupby("bucket").map_groups(fold, batch_format="pandas")
           .to_pandas())
    cx = per[per["kind"] == 0].groupby("h")["v"].sum()
    na, nb, nab, nu = (int(cx.get(i, 0)) for i in range(4))
    sk = per[per["kind"] == 1].sort_values("h")
    h = sk["h"].to_numpy(np.int64)
    a = sk["a"].to_numpy(np.int8)
    b = sk["b"].to_numpy(np.int8)

    def kmv_est(hs: np.ndarray, exact: int) -> int:
        if exact < k or len(hs) < k:
            return exact
        return ((k - 1) * (1 << 60)) // int(hs[k - 1])

    est_a = kmv_est(h[a == 1], na)
    est_b = kmv_est(h[b == 1], nb)
    est_u = kmv_est(h, nu)
    if nu < k:
        est_i = nab
    else:
        n_both = int(((a == 1) & (b == 1))[:k].sum())
        est_i = (n_both * est_u) // k
    rows = []
    for name, exact, est in (
            ("click_users", na, est_a),
            ("intersect_users", nab, est_i),
            ("purchase_users", nb, est_b),
            ("union_users", nu, est_u)):
        err = 10_000 * abs(est - exact) // exact if exact > 0 else -1
        rows.append((name, exact, est, err))
    return pd.DataFrame(rows, columns=[
        "metric", "exact_count", "est_count", "err_bps"]).astype(
        {"exact_count": "int64", "est_count": "int64",
         "err_bps": "int64"})


def simpson_paradox_audit(sf_dir: str) -> pd.DataFrame:
    """SIMPSON'S-PARADOX audit on the discount→quantity relationship:
    the OLS slope over ALL lineitems vs within each returnflag
    stratum — the aggregation trap every metrics dashboard needs a
    tripwire for. Five integer moments (n, Sx, Sy, Sxx, Sxy) fold
    map-side per flag (a 4-row grid at any scale, NO exchange beyond
    the tiny grouped sum); the slope is the exact Cramer ratio
    sign-normalized to milli units (sgn·(1000·|num| // |den|), the
    house negative-division rule), so no float ever enters."""
    ds = _read(sf_dir, "lineitem",
               columns=["l_returnflag", "l_discount", "l_quantity"])

    def partial(t: pa.Table) -> pa.Table:
        fl = np.asarray(t.column("l_returnflag"), dtype=object)
        x = np.floor(t.column("l_discount").to_numpy()
                     * 100.0).astype(np.int64)
        y = np.floor(t.column("l_quantity").to_numpy()) \
            .astype(np.int64)
        uf, inv = np.unique(fl, return_inverse=True)
        return pa.table({
            "flag": pa.array(list(uf), type=pa.string()),
            "n": pa.array(np.bincount(inv).astype(np.int64)),
            "sx": pa.array(np.bincount(inv, weights=x)
                           .astype(np.int64)),
            "sy": pa.array(np.bincount(inv, weights=y)
                           .astype(np.int64)),
            "sxx": pa.array(np.bincount(inv, weights=x * x)
                            .astype(np.int64)),
            "sxy": pa.array(np.bincount(inv, weights=x * y)
                            .astype(np.int64))})

    g = (ds.map_batches(partial, batch_format="pyarrow")
         .groupby("flag")
         .aggregate(Sum("n", alias_name="n"),
                    Sum("sx", alias_name="sx"),
                    Sum("sy", alias_name="sy"),
                    Sum("sxx", alias_name="sxx"),
                    Sum("sxy", alias_name="sxy"))
         .to_pandas().sort_values("flag").reset_index(drop=True))
    tot = g[["n", "sx", "sy", "sxx", "sxy"]].sum()
    rows = []
    for name, m in ([("ALL", tot)]
                    + [(r["flag"], r) for _, r in g.iterrows()]):
        n, sx, sy, sxx, sxy = (int(m[c]) for c in
                               ("n", "sx", "sy", "sxx", "sxy"))
        num = n * sxy - sx * sy
        den = n * sxx - sx * sx
        sgn = (num > 0) - (num < 0)
        slope = sgn * ((1000 * abs(num)) // den) if den > 0 else 0
        rows.append((name, n, slope, sgn))
    return pd.DataFrame(rows, columns=[
        "grp", "n_lines", "slope_milli", "slope_sign"]).astype(
        {"n_lines": "int64", "slope_milli": "int64",
         "slope_sign": "int64"}).sort_values("grp") \
        .reset_index(drop=True)


def embedding_isotropy_audit(sf_dir: str) -> pd.DataFrame:
    """ISOTROPY audit of the embedding space: how many of the d·(d-1)/2
    dimension pairs are correlated beyond |r| >= 0.05 / 0.10 / 0.20 —
    the whitening-needed signal a retrieval stack checks before
    trusting cosine distances. Each block emits ONE fixed-size partial
    (the d×d int64 Gram of 1e-3 fixed-point values packed as binary,
    plus column sums — ZERO shuffle, a gradient-style all-reduce like
    ``embedding_dim_stats``); the driver thresholds every pair with
    the exact integer cross-multiplication 10000·num² >= t²·den_i·
    den_j, so no float or sqrt ever decides a pair."""
    ds = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet",
                               columns=["embedding"])

    def partial(t: pa.Table) -> pa.Table:
        arr = t.column("embedding").combine_chunks()
        flat = arr.flatten().to_numpy(zero_copy_only=False)
        dim = len(flat) // len(arr)
        fp = np.floor(flat.astype(np.float64) * 1000.0) \
            .astype(np.int64).reshape(-1, dim)
        return pa.table({
            "n": pa.array([fp.shape[0]], type=pa.int64()),
            "d": pa.array([dim], type=pa.int64()),
            "s": pa.array([fp.sum(axis=0).tobytes()],
                          type=pa.large_binary()),
            "g": pa.array([(fp.T @ fp).tobytes()],
                          type=pa.large_binary())})

    rows = ds.map_batches(partial, batch_format="pyarrow").take_all()
    n = sum(int(r["n"]) for r in rows)
    d = int(rows[0]["d"])
    s = np.sum([np.frombuffer(r["s"], dtype=np.int64) for r in rows],
               axis=0)
    gm = np.sum([np.frombuffer(r["g"], dtype=np.int64)
                 .reshape(d, d) for r in rows], axis=0)
    den = [n * int(gm[i, i]) - int(s[i]) * int(s[i])
           for i in range(d)]
    ge = [0, 0, 0]
    n_pairs = 0
    for i in range(d):
        for j in range(i + 1, d):
            n_pairs += 1
            num = n * int(gm[i, j]) - int(s[i]) * int(s[j])
            lhs = 10_000 * num * num
            rhs = den[i] * den[j]
            for t_, tsq in enumerate((25, 100, 400)):
                if lhs >= tsq * rhs:
                    ge[t_] += 1
    return pd.DataFrame(
        [(d, n, n_pairs, ge[0], ge[1], ge[2],
          10_000 * ge[0] // n_pairs, 10_000 * ge[1] // n_pairs,
          10_000 * ge[2] // n_pairs)],
        columns=["d", "n_vecs", "n_pairs", "ge5", "ge10", "ge20",
                 "ge5_bps", "ge10_bps", "ge20_bps"]).astype("int64")


def tcloseness_audit(sf_dir: str) -> pd.DataFrame:
    """T-CLOSENESS privacy audit — the third leg of the k-anonymity /
    l-diversity trio: for each quasi-identifier group (order priority,
    order month), the total-variation distance between the group's
    sensitive-attribute (order status) distribution and the GLOBAL
    one, in exact integer bps: tv = (10^4·Σ_s|o_s·N − g·c_s|) //
    (2·g·N). Groups band at t = 0.10 / 0.20 / 0.30; per band we report
    group count, row count and row share. Same dimension-sized
    (pr, mo, st) grouped count as ``ldiversity_audit`` — no exchange
    a 100-TB run would feel."""
    ds = _read(sf_dir, "orders",
               columns=["o_orderpriority", "o_orderdate",
                        "o_orderstatus"])

    def derive(t: pa.Table) -> pa.Table:
        mo = t.column("o_orderdate").to_numpy() \
            .astype("datetime64[M]").astype(np.int64)
        return pa.table({"pr": t.column("o_orderpriority"),
                         "mo": pa.array(mo),
                         "st": t.column("o_orderstatus")})

    g = (ds.map_batches(derive, batch_format="pyarrow")
         .groupby(["pr", "mo", "st"])
         .aggregate(Count(alias_name="n")).to_pandas())
    big_n = int(g["n"].sum())
    cs = g.groupby("st")["n"].sum()
    rows = []
    for (pr, mo), sub in g.groupby(["pr", "mo"]):
        gn = int(sub["n"].sum())
        acc = 0
        for st in cs.index:
            o = int(sub[sub["st"] == st]["n"].sum())
            acc += abs(o * big_n - gn * int(cs[st]))
        tv = (10_000 * acc) // (2 * gn * big_n)
        band = 0 if tv <= 1000 else 1 if tv <= 2000 \
            else 2 if tv <= 3000 else 3
        rows.append((band, gn, tv))
    df = pd.DataFrame(rows, columns=["band", "g", "tv"])
    out = (df.groupby("band", as_index=False)
           .agg(n_groups=("g", "size"), n_rows=("g", "sum"),
                max_tv_bps=("tv", "max")))
    out["rows_share_bps"] = (10_000 * out["n_rows"]) // big_n
    return out.sort_values("band").reset_index(drop=True) \
        .astype("int64")


def ab_power_mde(sf_dir: str) -> pd.DataFrame:
    """EXPERIMENT-POWER readout: for each event type, the minimum
    detectable absolute effect (80% power, alpha = 5%, z-sum 2.8) of
    a 50/50 user split on the "has >= 1 event of this type" binary
    metric — the table an experimentation platform shows before
    anyone launches a test. Per-user type flags fold through one
    ``user % 64`` exchange into exact integer (n_users, n_with)
    counts; the MDE is the ONE final float expression, written with
    the identical operation order in Python and SQL (the house
    IEEE-order-matching rule), floored to bps."""
    import math

    ds = _read(sf_dir, "events", columns=["user_id", "event_type"])

    def derive(t: pa.Table) -> pa.Table:
        uid = t.column("user_id").to_numpy().astype(np.int64)
        et = np.asarray(t.column("event_type"), dtype=object)
        df = pd.DataFrame({"u": uid, "ty": et}).drop_duplicates()
        u = df["u"].to_numpy(np.int64)
        return pa.table({
            "u": pa.array(u),
            "ty": pa.array(list(df["ty"]), type=pa.string()),
            "bucket": pa.array((u % 64).astype(np.int32))})

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        d = g.drop_duplicates(["u", "ty"])
        nt = d.groupby("ty")["u"].nunique()
        return pd.DataFrame({
            "ty": list(nt.index) + ["__all__"],
            "n": list(nt.to_numpy(np.int64))
            + [d["u"].nunique()]})

    per = (ds.map_batches(derive, batch_format="pyarrow")
           .groupby("bucket").map_groups(fold, batch_format="pandas")
           .to_pandas().groupby("ty", as_index=False)["n"].sum())
    n_users = int(per[per["ty"] == "__all__"]["n"].iloc[0])
    nh = n_users // 2
    rows = []
    for _, r in per[per["ty"] != "__all__"].iterrows():
        nw = int(r["n"])
        p = nw / n_users
        mde = math.floor(10_000.0 * (2.8 * math.sqrt(
            (2.0 * p * (1.0 - p)) / nh)))
        rows.append((r["ty"], n_users, nw,
                     10_000 * nw // n_users, mde))
    return (pd.DataFrame(rows, columns=[
        "event_type", "n_users", "n_with", "p_bps", "mde_bps"])
        .sort_values("event_type").reset_index(drop=True)
        .astype({c: "int64" for c in
                 ("n_users", "n_with", "p_bps", "mde_bps")}))


def poisson_bootstrap_ci(sf_dir: str, reps: int = 64) -> pd.DataFrame:
    """POISSON-BOOTSTRAP confidence interval for the mean order value —
    the streaming bootstrap (each row enters replicate b with a
    Poisson(1) weight) that needs NO resampling pass and therefore
    scales to any row count. Weights are DETERMINISTIC: md5(orderkey
    '#' b) % 1000 cut at the Poisson(1) CDF thresholds [368, 736, 920,
    981, 996], so the SQL twin reproduces every weight. Each batch
    emits one fixed-size partial (64 weighted sums + 64 weight counts,
    packed binary like the histogram folds — ZERO shuffle); replicate
    means are exact integer floors and the driver reads p5/p50/p95
    off the sorted 64-vector."""
    ds = _read(sf_dir, "orders",
               columns=["o_orderkey", "o_totalprice"])
    thr = np.array([368, 736, 920, 981, 996], np.int64)

    def partial(t: pa.Table) -> pa.Table:
        from ..functions.hashing import hash64_many
        key = t.column("o_orderkey").to_numpy().astype(np.int64)
        cents = np.floor(t.column("o_totalprice").to_numpy()
                         * 100.0).astype(np.int64)
        s = np.zeros(reps, np.int64)
        c = np.zeros(reps, np.int64)
        ks = [str(int(x)) for x in key]
        for b in range(reps):
            suf = f"#{b}"
            w = np.searchsorted(
                thr, (hash64_many([x + suf for x in ks])
                      % np.uint64(1000)).astype(np.int64),
                side="right")
            s[b] = int((w * cents).sum())
            c[b] = int(w.sum())
        return pa.table({
            "s": pa.array([s.tobytes()], type=pa.large_binary()),
            "c": pa.array([c.tobytes()], type=pa.large_binary())})

    rows = ds.map_batches(partial, batch_format="pyarrow").take_all()
    s = np.sum([np.frombuffer(r["s"], dtype=np.int64) for r in rows],
               axis=0)
    c = np.sum([np.frombuffer(r["c"], dtype=np.int64) for r in rows],
               axis=0)
    means = np.sort(s // np.maximum(c, 1))
    p5, p50, p95 = (int(means[(q * reps) // 100])
                    for q in (5, 50, 95))
    return pd.DataFrame(
        [(reps, int(means.sum()) // reps, p5, p50, p95, p95 - p5)],
        columns=["n_reps", "mean_of_means_cents", "p5_cents",
                 "p50_cents", "p95_cents", "ci_width_cents"]) \
        .astype("int64")


def survivorship_bias_audit(sf_dir: str) -> pd.DataFrame:
    """SURVIVORSHIP-BIAS audit: per first-order cohort year, compare
    the average FIRST-order value of customers who came back (>= 2
    orders) vs one-shot customers — the bias every retention analysis
    silently conditions on. One ``custkey % 64`` exchange; per bucket
    a lexsort + segment-first emits each customer's (cohort year,
    first cents, order count); per-cohort sums are a tiny grid and the
    uplift is the exact cross-multiplied integer
    sgn·(10^4·|s_rep·n_one − s_one·n_rep|) // (s_one·n_rep) in Python
    bigints (HUGEINT in the twin)."""
    ds = _read(sf_dir, "orders",
               columns=["o_custkey", "o_orderdate", "o_orderkey",
                        "o_totalprice"])

    def derive(t: pa.Table) -> pa.Table:
        c = t.column("o_custkey").to_numpy().astype(np.int64)
        return pa.table({
            "c": pa.array(c),
            "d": t.column("o_orderdate").cast(pa.int64()),
            "k": t.column("o_orderkey").cast(pa.int64()),
            "yr": pa.array(t.column("o_orderdate").to_numpy()
                           .astype("datetime64[Y]").astype(np.int64)
                           + 1970),
            "cents": pa.array(np.floor(
                t.column("o_totalprice").to_numpy() * 100.0)
                .astype(np.int64)),
            "bucket": pa.array((c % 64).astype(np.int32))})

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        c = g["c"].to_numpy(np.int64)
        d = g["d"].to_numpy(np.int64)
        k = g["k"].to_numpy(np.int64)
        yr = g["yr"].to_numpy(np.int64)
        cents = g["cents"].to_numpy(np.int64)
        order = np.lexsort((k, d, c))
        c, yr, cents = c[order], yr[order], cents[order]
        brk = np.empty(len(c), bool)
        brk[0] = True
        brk[1:] = c[1:] != c[:-1]
        starts = np.flatnonzero(brk)
        cnt = np.diff(np.append(starts, len(c)))
        fy = yr[starts]
        fc = cents[starts]
        rep = (cnt >= 2).astype(np.int64)
        df = pd.DataFrame({"yr": fy, "rep": rep, "fc": fc})
        return (df.groupby(["yr", "rep"], as_index=False)
                .agg(n=("fc", "size"), s=("fc", "sum")))

    g = (ds.map_batches(derive, batch_format="pyarrow")
         .groupby("bucket").map_groups(fold, batch_format="pandas")
         .to_pandas().groupby(["yr", "rep"], as_index=False).sum())
    rows = []
    for yr in sorted(g["yr"].unique()):
        sub = g[g["yr"] == yr]
        n1 = int(sub[sub["rep"] == 0]["n"].sum())
        s1 = int(sub[sub["rep"] == 0]["s"].sum())
        nr = int(sub[sub["rep"] == 1]["n"].sum())
        sr = int(sub[sub["rep"] == 1]["s"].sum())
        if n1 == 0 or nr == 0 or s1 == 0:
            uplift = 0
        else:
            dnum = sr * n1 - s1 * nr
            sgn = (dnum > 0) - (dnum < 0)
            uplift = sgn * ((10_000 * abs(dnum)) // (s1 * nr))
        rows.append((int(yr), n1, nr,
                     s1 // n1 if n1 else 0,
                     sr // nr if nr else 0, uplift))
    return pd.DataFrame(rows, columns=[
        "cohort_year", "n_oneshot", "n_repeat",
        "avg_first_oneshot_cents", "avg_first_repeat_cents",
        "uplift_bps"]).astype("int64")


def f2_ams_audit(sf_dir: str, reps: int = 16) -> pd.DataFrame:
    """AMS (Tug-of-War) second-frequency-moment sketch audit: estimate
    the SELF-JOIN SIZE of lineitem on partkey (F2 = Σ_k c_k², the
    number a join-order optimizer lives on) from 16 deterministic
    ±1 md5 sign streams — each block emits one packed 16-vector of
    sign sums (ZERO shuffle), each estimator is (Σ signs)², and the
    reported estimate is the lower median of the 16, against the
    exact F2 from a part-cardinality grouped count. Pure integers
    end to end; every sign is md5(key '#' j) % 2 so the SQL twin
    reproduces the whole sketch."""
    from ..functions.hashing import hash64_many

    ds = _read(sf_dir, "lineitem", columns=["l_partkey"])

    def partial(t: pa.Table) -> pa.Table:
        key = t.column("l_partkey").to_numpy().astype(np.int64)
        u, c = np.unique(key, return_counts=True)
        ks = [str(int(x)) for x in u]
        s = np.zeros(reps, np.int64)
        for j in range(reps):
            suf = f"#{j}"
            sign = 2 * (hash64_many([x + suf for x in ks])
                        % np.uint64(2)).astype(np.int64) - 1
            s[j] = int((sign * c).sum())
        return pa.table({
            "n": pa.array([len(key)], type=pa.int64()),
            "s": pa.array([s.tobytes()], type=pa.large_binary())})

    rows = ds.map_batches(partial, batch_format="pyarrow").take_all()
    n_rows = sum(int(r["n"]) for r in rows)
    s = np.sum([np.frombuffer(r["s"], dtype=np.int64) for r in rows],
               axis=0)

    def counts(t: pa.Table) -> pa.Table:
        key = t.column("l_partkey").to_numpy().astype(np.int64)
        u, c = np.unique(key, return_counts=True)
        return pa.table({"k": pa.array(u),
                         "c": pa.array(c.astype(np.int64))})

    ex = (_read(sf_dir, "lineitem", columns=["l_partkey"])
          .map_batches(counts, batch_format="pyarrow")
          .groupby("k").aggregate(Sum("c", alias_name="c"))
          .to_pandas())
    cs = ex["c"].to_numpy(np.int64)
    f2 = int(np.dot(cs, cs))
    est_all = np.sort(s * s)
    est = int(est_all[(reps - 1) // 2])
    err = 10_000 * abs(est - f2) // f2 if f2 else 0
    return pd.DataFrame(
        [(n_rows, len(cs), f2, est, err)],
        columns=["n_rows", "n_keys", "f2_exact", "f2_est",
                 "err_bps"]).astype("int64")


def frequency_cap_audit(sf_dir: str) -> pd.DataFrame:
    """FREQUENCY-CAP audit: if per-user DAILY event caps of 5 / 10 /
    20 were enforced, how many user-days trip each cap and how many
    events would be dropped — the rate-limit sizing table for an
    ingestion or ad-serving pipeline. Per batch, (user, day) counts
    partial via a packed ``(user << 16) | day`` int64 key; ONE
    ``key % 64`` exchange folds exact per-user-day counts; each
    bucket emits a 3-row threshold partial, so the driver sums tiny
    grids. Excess share is exact integer bps of total events."""
    ds = _read(sf_dir, "events", columns=["user_id", "ts"])

    def derive(t: pa.Table) -> pa.Table:
        u = t.column("user_id").to_numpy().astype(np.int64)
        day = t.column("ts").to_numpy() \
            .astype("datetime64[D]").astype(np.int64)
        key = (u << 16) | day
        uk, c = np.unique(key, return_counts=True)
        return pa.table({
            "k": pa.array(uk), "n": pa.array(c.astype(np.int64)),
            "bucket": pa.array(
                (uk.view(np.uint64) % 64).astype(np.int32))})

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        k = g["k"].to_numpy(np.int64)
        n = g["n"].to_numpy(np.int64)
        order = np.argsort(k, kind="mergesort")
        k, n = k[order], n[order]
        brk = np.empty(len(k), bool)
        brk[0] = True
        brk[1:] = k[1:] != k[:-1]
        c = np.add.reduceat(n, np.flatnonzero(brk))
        rows = []
        for cap in (5, 10, 20):
            over = c > cap
            rows.append((cap, len(c), int(over.sum()),
                         int((c[over] - cap).sum()), int(c.sum())))
        return pd.DataFrame(rows, columns=[
            "cap", "ud", "n_over", "excess", "ev"]).astype("int64")

    per = (ds.map_batches(derive, batch_format="pyarrow")
           .groupby("bucket").map_groups(fold, batch_format="pandas")
           .to_pandas().groupby("cap", as_index=False).sum()
           .sort_values("cap").reset_index(drop=True))
    per["excess_share_bps"] = (10_000 * per["excess"]) // per["ev"]
    return per.rename(columns={
        "ud": "n_user_days", "ev": "n_events"})[[
        "cap", "n_user_days", "n_over", "excess",
        "n_events", "excess_share_bps"]].astype("int64")


def ratio_delta_method(sf_dir: str) -> pd.DataFrame:
    """RATIO-METRIC standard error via the DELTA METHOD — revenue per
    active day is a ratio of two user-level random variables, and
    naively treating it as a mean understates the variance; this op
    computes the delta-method SE the way an experimentation platform
    must. Per user: x = purchase cents, y = distinct active days;
    six exact integer moments fold through ONE ``user % 64`` exchange
    (bucket partials in int64, driver accumulation in Python ints —
    the cents² overflow rule); the SE is the ONE final float block,
    written with identical operation order in numpy/Python and SQL,
    floored to micro units."""
    import math

    ds = _read(sf_dir, "events",
               columns=["user_id", "ts", "event_type", "value"])

    def derive(t: pa.Table) -> pa.Table:
        u = t.column("user_id").to_numpy().astype(np.int64)
        day = t.column("ts").to_numpy() \
            .astype("datetime64[D]").astype(np.int64)
        et = np.asarray(t.column("event_type"), dtype=object)
        cents = np.floor(t.column("value").to_numpy()
                         * 100.0).astype(np.int64)
        cents = np.where(et == "purchase", cents, 0)
        return pa.table({
            "u": pa.array(u), "day": pa.array(day),
            "cents": pa.array(cents),
            "bucket": pa.array((u % 64).astype(np.int32))})

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        u = g["u"].to_numpy(np.int64)
        day = g["day"].to_numpy(np.int64)
        cents = g["cents"].to_numpy(np.int64)
        order = np.lexsort((day, u))
        u, day, cents = u[order], day[order], cents[order]
        ubrk = np.empty(len(u), bool)
        ubrk[0] = True
        ubrk[1:] = u[1:] != u[:-1]
        newday = np.empty(len(u), bool)
        newday[0] = True
        newday[1:] = (u[1:] != u[:-1]) | (day[1:] != day[:-1])
        uid = np.cumsum(ubrk) - 1
        n_u = int(uid[-1]) + 1 if len(u) else 0
        x = np.bincount(uid, weights=cents,
                        minlength=n_u).astype(np.int64)
        y = np.bincount(uid[newday], minlength=n_u).astype(np.int64)
        return pd.DataFrame({
            "m": ["n", "sx", "sy", "sxx", "syy", "sxy"],
            "v": [n_u, int(x.sum()), int(y.sum()),
                  int((x * x).sum()), int((y * y).sum()),
                  int((x * y).sum())]})

    per = (ds.map_batches(derive, batch_format="pyarrow")
           .groupby("bucket").map_groups(fold, batch_format="pandas")
           .to_pandas())
    agg = {k: 0 for k in ("n", "sx", "sy", "sxx", "syy", "sxy")}
    for _, r in per.iterrows():
        agg[r["m"]] += int(r["v"])
    n, sx, sy = agg["n"], agg["sx"], agg["sy"]
    mx, my = sx / n, sy / n
    vx = agg["sxx"] / n - mx * mx
    vy = agg["syy"] / n - my * my
    cxy = agg["sxy"] / n - mx * my
    r_ = mx / my
    var = (vx - 2.0 * r_ * cxy + r_ * r_ * vy) / (n * my * my)
    se = math.floor(1_000_000.0 * math.sqrt(var)) if var > 0 else 0
    return pd.DataFrame(
        [(n, sx, sy, (1000 * sx) // sy, se)],
        columns=["n_users", "sum_cents", "sum_days", "ratio_milli",
                 "se_micro"]).astype("int64")


def churn_rule_confusion(sf_dir: str) -> pd.DataFrame:
    """CHURN-RULE backtest: predict "user will be inactive in the
    second half" from "no activity in the last 30 days of the first
    half", then score the rule against what actually happened — the
    confusion matrix + precision/recall every retention model is
    benchmarked against before anything fancier ships. Midpoint is
    the exact integer (min_day + max_day + 1) // 2 (the ``hte`` rule);
    per-user (last H1 day, any-H2 flag) folds through ONE ``user %
    64`` exchange; the driver sums a 4-cell grid."""
    ds = _read(sf_dir, "events", columns=["user_id", "ts"])

    lohi = ds.map_batches(
        lambda t: pa.table({
            "lo": pa.array([int(t.column("ts").to_numpy()
                                .astype("datetime64[D]")
                                .astype(np.int64).min())]),
            "hi": pa.array([int(t.column("ts").to_numpy()
                                .astype("datetime64[D]")
                                .astype(np.int64).max())])}),
        batch_format="pyarrow").to_pandas()
    mid = (int(lohi["lo"].min()) + int(lohi["hi"].max()) + 1) // 2

    def derive(t: pa.Table) -> pa.Table:
        u = t.column("user_id").to_numpy().astype(np.int64)
        day = t.column("ts").to_numpy() \
            .astype("datetime64[D]").astype(np.int64)
        return pa.table({
            "u": pa.array(u), "day": pa.array(day),
            "bucket": pa.array((u % 64).astype(np.int32))})

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        u = g["u"].to_numpy(np.int64)
        day = g["day"].to_numpy(np.int64)
        h1 = day < mid
        lasth1 = pd.Series(np.where(h1, day, np.int64(-10**9))) \
            .groupby(u).max()
        anyh2 = pd.Series((~h1).astype(np.int64)).groupby(u).max()
        act = lasth1 > -10**9
        pred = act & (mid - lasth1 > 30)
        actual = act & (anyh2 == 0)
        tp = int((pred & actual).sum())
        fp = int((pred & ~actual & act).sum())
        fn = int((~pred & actual & act).sum())
        tn = int((~pred & ~actual & act).sum())
        return pd.DataFrame({
            "cell": ["tp", "fp", "fn", "tn"],
            "v": [tp, fp, fn, tn]})

    per = (ds.map_batches(derive, batch_format="pyarrow")
           .groupby("bucket").map_groups(fold, batch_format="pandas")
           .to_pandas().groupby("cell")["v"].sum())
    tp, fp, fn, tn = (int(per.get(k, 0))
                      for k in ("tp", "fp", "fn", "tn"))
    prec = 10_000 * tp // (tp + fp) if tp + fp else -1
    rec = 10_000 * tp // (tp + fn) if tp + fn else -1
    return pd.DataFrame(
        [(mid, tp + fp + fn + tn, tp, fp, fn, tn, prec, rec)],
        columns=["mid_day", "n_h1_users", "tp", "fp", "fn", "tn",
                 "precision_bps", "recall_bps"]).astype("int64")


def hdr_quantile_audit(sf_dir: str) -> pd.DataFrame:
    """HDR-HISTOGRAM quantile audit: reconstruct p50/p90/p99 of the
    event value (cents) from power-of-two (ilog2) buckets — the
    fixed-size latency-histogram trick — and report each against the
    EXACT nearest-rank quantile with the one-sided error in bps.
    Exact quantiles come from a value-level count fold (the value
    domain is bounded — cents — so the fold is dimension-sized at
    any row count) through ONE ``value % 64`` exchange; the HDR
    estimate is the bucket upper bound 2^(b+1) − 2, derived from the
    same fold, so the audit costs ONE pass. Bucket index via
    ``np.frexp`` (exact), printf('%b') in the twin."""
    ds = _read(sf_dir, "events", columns=["value"])

    def derive(t: pa.Table) -> pa.Table:
        cents = np.floor(t.column("value").to_numpy()
                         * 100.0).astype(np.int64)
        u, c = np.unique(cents, return_counts=True)
        return pa.table({
            "v": pa.array(u), "n": pa.array(c.astype(np.int64)),
            "bucket": pa.array(
                (u.view(np.uint64) % 64).astype(np.int32))})

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        v = g["v"].to_numpy(np.int64)
        n = g["n"].to_numpy(np.int64)
        order = np.argsort(v, kind="mergesort")
        v, n = v[order], n[order]
        brk = np.empty(len(v), bool)
        brk[0] = True
        brk[1:] = v[1:] != v[:-1]
        starts = np.flatnonzero(brk)
        return pd.DataFrame({
            "v": v[brk],
            "n": np.add.reduceat(n, starts).astype(np.int64)})

    vc = (ds.map_batches(derive, batch_format="pyarrow")
          .groupby("bucket").map_groups(fold, batch_format="pandas")
          .to_pandas().sort_values("v").reset_index(drop=True))
    v = vc["v"].to_numpy(np.int64)
    n = vc["n"].to_numpy(np.int64)
    total = int(n.sum())
    cum = np.cumsum(n)
    b = (np.frexp((v + 1).astype(np.float64))[1] - 1) \
        .astype(np.int64)
    nb = np.bincount(b, weights=n).astype(np.int64)
    cumb = np.cumsum(nb)
    rows = []
    for p in (50, 90, 99):
        k = (p * (total - 1)) // 100
        exact = int(v[np.searchsorted(cum, k + 1)])
        bq = int(np.searchsorted(cumb, k + 1))
        est = (1 << (bq + 1)) - 2
        rows.append((p, exact, est,
                     10_000 * (est - exact) // max(exact, 1)))
    return pd.DataFrame(rows, columns=[
        "p", "exact_cents", "hdr_est_cents", "err_bps"]) \
        .astype("int64")


def ab_srm_check(sf_dir: str) -> pd.DataFrame:
    """SAMPLE-RATIO-MISMATCH check — the first gate every A/B readout
    must pass: under the id-parity mock arms (user_id % 2, the same
    assignment ``hte_by_decile`` uses), is the observed arm split
    consistent with 50/50? Chi-square with 1 df in exact integer
    milli units (1000·(n_a − n_b)² // (n_a + n_b)), flagged at the
    3.841 critical value, at BOTH granularities (distinct users and
    raw events — an event-level-only pass hides user skew). Distinct
    users fold through one ``user % 64`` exchange; event counts are
    map-side bincounts."""
    ds = _read(sf_dir, "events", columns=["user_id"])

    def derive(t: pa.Table) -> pa.Table:
        u = t.column("user_id").to_numpy().astype(np.int64)
        uu = np.unique(u)
        return pa.table({
            "u": pa.array(uu),
            "ne_a": pa.array(np.full(len(uu), 0, np.int64)
                             if not len(uu) else np.where(
                np.arange(len(uu)) == 0,
                int((u % 2 == 0).sum()), 0)),
            "ne_b": pa.array(np.full(len(uu), 0, np.int64)
                             if not len(uu) else np.where(
                np.arange(len(uu)) == 0,
                int((u % 2 == 1).sum()), 0)),
            "bucket": pa.array((uu % 64).astype(np.int32))})

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        u = np.unique(g["u"].to_numpy(np.int64))
        return pd.DataFrame({
            "m": ["ua", "ub", "ea", "eb"],
            "v": [int((u % 2 == 0).sum()), int((u % 2 == 1).sum()),
                  int(g["ne_a"].sum()), int(g["ne_b"].sum())]})

    per = (ds.map_batches(derive, batch_format="pyarrow")
           .groupby("bucket").map_groups(fold, batch_format="pandas")
           .to_pandas().groupby("m")["v"].sum())
    rows = []
    for unit, a, b in (("events", int(per["ea"]), int(per["eb"])),
                       ("users", int(per["ua"]), int(per["ub"]))):
        chi = 1000 * (a - b) * (a - b) // (a + b)
        rows.append((unit, a, b, chi, int(chi > 3841)))
    return pd.DataFrame(rows, columns=[
        "unit", "n_a", "n_b", "chi2_milli", "srm_flag"]).astype(
        {c: "int64" for c in ("n_a", "n_b", "chi2_milli",
                              "srm_flag")})


def mta_linear_credit(sf_dir: str) -> pd.DataFrame:
    """MULTI-TOUCH ATTRIBUTION, linear model: every purchase splits
    1000 milli-credits equally across the user's touches (any
    non-purchase event) in the 7 days strictly before it — the
    channel-credit table a marketing platform prints. One ``user %
    64`` exchange; per bucket the per-purchase window counts resolve
    with a packed-key (compact_user_idx·shift + rel_ts_us,
    shift > max rel so keys never collide across users at ANY user-id
    scale) double-searchsorted per channel — probes never cross users
    and there is NO per-row loop. Credits are per-purchase integer
    floors (1000·c_ch // n_touch) so the SQL join twin matches
    exactly."""
    win = 604_800_000_000

    ds = _read(sf_dir, "events",
               columns=["event_id", "user_id", "ts", "event_type"])
    channels = ("click", "error", "signup", "view")

    def derive(t: pa.Table) -> pa.Table:
        u = t.column("user_id").to_numpy().astype(np.int64)
        return pa.table({
            "u": pa.array(u),
            "ts": t.column("ts").cast(pa.int64()),
            "ty": t.column("event_type"),
            "bucket": pa.array((u % 64).astype(np.int32))})

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        u = g["u"].to_numpy(np.int64)
        ts = g["ts"].to_numpy(np.int64)
        ty = g["ty"].to_numpy(object)
        isp = ty == "purchase"
        n_purch = int(isp.sum())
        if n_purch == 0:
            return pd.DataFrame({"k": ["np", "na"],
                                 "v": [0, 0]})
        uu = np.unique(u)
        t0 = int(ts.min())
        rel = ts - t0
        shift = int(rel.max()) + win + 2
        idx = np.searchsorted(uu, u).astype(np.int64)
        pidx, prel = idx[isp], rel[isp]
        probe_hi = pidx * shift + prel
        probe_lo = pidx * shift + np.maximum(prel - win, 0)
        cnt = {}
        for c in channels:
            m = ty == c
            pk = np.sort(idx[m] * shift + rel[m])
            lo = np.searchsorted(pk, probe_lo, side="left")
            hi = np.searchsorted(pk, probe_hi, side="left")
            cnt[c] = (hi - lo).astype(np.int64)
        ntouch = sum(cnt.values())
        attr = ntouch > 0
        ks, vs = ["np", "na"], [n_purch, int(attr.sum())]
        nt_safe = np.maximum(ntouch, 1)
        for c in channels:
            ks.append(f"t_{c}")
            vs.append(int(cnt[c].sum()))
            ks.append(f"c_{c}")
            vs.append(int(((1000 * cnt[c]) // nt_safe)[attr].sum()))
        return pd.DataFrame({"k": ks, "v": vs})

    per = (ds.map_batches(derive, batch_format="pyarrow")
           .groupby("bucket").map_groups(fold, batch_format="pandas")
           .to_pandas().groupby("k")["v"].sum())
    tot_credit = sum(int(per.get(f"c_{c}", 0)) for c in channels)
    rows = []
    for c in channels:
        tch = int(per.get(f"t_{c}", 0))
        cr = int(per.get(f"c_{c}", 0))
        if tch == 0:
            continue
        rows.append((c, tch, cr,
                     10_000 * cr // tot_credit if tot_credit else 0,
                     int(per.get("np", 0)), int(per.get("na", 0))))
    return pd.DataFrame(rows, columns=[
        "event_type", "touches", "credit_milli", "credit_share_bps",
        "n_purchases", "n_attributed"]).astype(
        {c: "int64" for c in ("touches", "credit_milli",
                              "credit_share_bps", "n_purchases",
                              "n_attributed")}) \
        .sort_values("event_type").reset_index(drop=True)


def mta_position_credit(sf_dir: str) -> pd.DataFrame:
    """POSITION-BASED (U-shaped 40/20/40) multi-touch attribution —
    the industry-standard sibling of ``mta_linear_credit``: per
    purchase, the FIRST touch in the 7-day window gets 400 milli,
    the LAST 400, and the middles split 200 with per-purchase
    integer floors (n=1 → 1000, n=2 → 500/500). First/last resolve
    from ONE lexsort by (user, ts, event_id) per bucket — window
    edges are the searchsorted bounds themselves, so identifying the
    boundary touches costs two fancy-index reads, no per-row loop;
    the tie order (ts, event_id) is mirrored by the twin's
    ROW_NUMBER. Same scale-safe compact-index packed key and single
    ``user % 64`` exchange as the linear op."""
    win = 604_800_000_000

    ds = _read(sf_dir, "events",
               columns=["event_id", "user_id", "ts", "event_type"])
    channels = ("click", "error", "signup", "view")

    def derive(t: pa.Table) -> pa.Table:
        u = t.column("user_id").to_numpy().astype(np.int64)
        return pa.table({
            "u": pa.array(u),
            "ts": t.column("ts").cast(pa.int64()),
            "eid": t.column("event_id").cast(pa.int64()),
            "ty": t.column("event_type"),
            "bucket": pa.array((u % 64).astype(np.int32))})

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        u = g["u"].to_numpy(np.int64)
        ts = g["ts"].to_numpy(np.int64)
        eid = g["eid"].to_numpy(np.int64)
        ty = g["ty"].to_numpy(object)
        isp = ty == "purchase"
        n_purch = int(isp.sum())
        ks, vs = ["np"], [n_purch]
        if n_purch == 0:
            return pd.DataFrame({"k": ks, "v": vs})
        uu = np.unique(u)
        t0 = int(ts.min())
        rel = ts - t0
        shift = int(rel.max()) + win + 2
        idx = np.searchsorted(uu, u).astype(np.int64)
        prel = rel[isp]
        probe_hi = idx[isp] * shift + prel
        probe_lo = idx[isp] * shift + np.maximum(prel - win, 0)
        # all touches, ordered by (user, ts, event_id): the window
        # [lo, hi) in this order starts at the first touch and ends
        # at the last
        mt = ~isp
        order = np.lexsort((eid[mt], rel[mt], idx[mt]))
        tkey = (idx[mt] * shift + rel[mt])[order]
        tty = ty[mt][order]
        lo = np.searchsorted(tkey, probe_lo, side="left")
        hi = np.searchsorted(tkey, probe_hi, side="left")
        n = (hi - lo).astype(np.int64)
        attr = n > 0
        if len(tty):
            first_ty = tty[np.minimum(lo, len(tty) - 1)]
            last_ty = tty[np.maximum(hi - 1, 0)]
        else:
            first_ty = np.full(n_purch, "", object)
            last_ty = np.full(n_purch, "", object)
        ks.append("na")
        vs.append(int(attr.sum()))
        nm2 = np.maximum(n - 2, 1)
        for c in channels:
            m = ty == c
            pk = np.sort(idx[m] * shift + rel[m])
            c_ch = (np.searchsorted(pk, probe_hi, side="left")
                    - np.searchsorted(pk, probe_lo,
                                      side="left")).astype(np.int64)
            isf = attr & (first_ty == c)
            isl = attr & (last_ty == c)
            mid = np.maximum(c_ch - isf - isl, 0)
            credit = np.where(
                n == 1, 1000 * isf,
                np.where(n == 2, 500 * isf + 500 * isl,
                         400 * isf + 400 * isl
                         + (200 * mid) // nm2))
            ks += [f"t_{c}", f"f_{c}", f"l_{c}", f"c_{c}"]
            vs += [int(c_ch.sum()), int(isf.sum()), int(isl.sum()),
                   int(credit[attr].sum())]
        return pd.DataFrame({"k": ks, "v": vs})

    per = (ds.map_batches(derive, batch_format="pyarrow")
           .groupby("bucket").map_groups(fold, batch_format="pandas")
           .to_pandas().groupby("k")["v"].sum())
    tot_credit = sum(int(per.get(f"c_{c}", 0)) for c in channels)
    rows = []
    for c in channels:
        tch = int(per.get(f"t_{c}", 0))
        if tch == 0:
            continue
        cr = int(per.get(f"c_{c}", 0))
        rows.append((c, tch, int(per.get(f"f_{c}", 0)),
                     int(per.get(f"l_{c}", 0)), cr,
                     10_000 * cr // tot_credit if tot_credit else 0))
    return pd.DataFrame(rows, columns=[
        "event_type", "touches", "first_touch", "last_touch",
        "credit_milli", "credit_share_bps"]).astype(
        {c: "int64" for c in ("touches", "first_touch", "last_touch",
                              "credit_milli", "credit_share_bps")}) \
        .sort_values("event_type").reset_index(drop=True)


def jackknife_mean_se(sf_dir: str) -> pd.DataFrame:
    """DELETE-ONE-BUCKET JACKKNIFE standard error of the mean order
    value — the resampling-free uncertainty estimate a streaming
    engine can afford: orders route to 64 deterministic
    md5(o_orderkey) buckets, each block emits one 64-cell exact
    integer (count, cents-sum) grid partial (ZERO shuffle), the
    driver folds Python-int totals, forms every leave-one-out mean
    in exact milli-cents, and the only float op on either side is
    the final FLOOR(SQRT(CAST(int AS DOUBLE))) — the identical IEEE
    round-to-nearest cast + correctly-rounded sqrt DuckDB runs, so
    the twin matches bit-for-bit."""
    from ..functions.hashing import hash64_many

    ds = _read(sf_dir, "orders", columns=["o_orderkey",
                                          "o_totalprice"])

    def partial(t: pa.Table) -> pa.Table:
        ok = t.column("o_orderkey").to_numpy().astype(np.int64)
        cents = np.floor(
            t.column("o_totalprice").to_numpy() * 100).astype(np.int64)
        bk = (hash64_many([str(k) for k in ok]) % 64).astype(np.int64)
        g = pd.DataFrame({"bk": bk, "c": cents}).groupby(
            "bk", as_index=False).agg(n_i=("c", "size"),
                                      s_i=("c", "sum"))
        return pa.table({"bk": pa.array(g["bk"].to_numpy(np.int64)),
                         "n_i": pa.array(g["n_i"].to_numpy(np.int64)),
                         "s_i": pa.array(g["s_i"].to_numpy(np.int64))})

    parts = (ds.map_batches(partial, batch_format="pyarrow")
             .to_pandas().groupby("bk", as_index=False).sum())
    n_i = [int(x) for x in parts["n_i"]]
    s_i = [int(x) for x in parts["s_i"]]
    n, s = sum(n_i), sum(s_i)
    g = len(n_i)
    m = [(1000 * (s - si)) // max(n - ni, 1)
         for ni, si in zip(n_i, s_i)]
    mbar = sum(m) // g
    ssq = sum((mi - mbar) * (mi - mbar) for mi in m)
    import math
    se = int(math.floor(math.sqrt(float((g - 1) * ssq // g))))
    mean_milli = 1000 * s // n
    return pd.DataFrame([(n, g, mean_milli, se,
                          10_000 * se // mean_milli)], columns=[
        "n_orders", "n_buckets", "mean_milli", "jk_se_milli",
        "rel_se_bps"]).astype("int64")


def randomized_response_audit(sf_dir: str) -> pd.DataFrame:
    """RANDOMIZED-RESPONSE privacy mechanism, end to end: each
    order's per-status membership bit is reported FLIPPED when the
    deterministic coin md5(orderkey#status) % 4 lands 0 (p_keep =
    3/4 — classic Warner), and the debiased count estimate
    (4·obs − n)/2 in exact milli units is audited against the true
    count in bps. Completes the k-anonymity / l-diversity /
    t-closeness privacy suite with the NOISE-side mechanism. Pure
    per-block integer partials, zero shuffle; every coin is the
    md5 expression the SQL twin reproduces."""
    from ..functions.hashing import hash64_many

    ds = _read(sf_dir, "orders", columns=["o_orderkey",
                                          "o_orderstatus"])
    statuses = ("F", "O", "P")

    def partial(t: pa.Table) -> pa.Table:
        ok = t.column("o_orderkey").to_numpy().astype(np.int64)
        st = np.asarray(t.column("o_orderstatus")).astype(object)
        rows = []
        for v in statuses:
            bit = (st == v).astype(np.int64)
            flip = (hash64_many(
                [f"{k}#{v}" for k in ok]) % 4 == 0).astype(np.int64)
            obs = np.where(flip == 1, 1 - bit, bit)
            rows.append((v, len(ok), int(bit.sum()), int(obs.sum())))
        return pa.table({
            "st": pa.array([r[0] for r in rows], type=pa.string()),
            "n": pa.array([r[1] for r in rows], type=pa.int64()),
            "tru": pa.array([r[2] for r in rows], type=pa.int64()),
            "obs": pa.array([r[3] for r in rows], type=pa.int64())})

    agg = (ds.map_batches(partial, batch_format="pyarrow")
           .to_pandas().groupby("st", as_index=False).sum()
           .sort_values("st").reset_index(drop=True))
    n = agg["n"].to_numpy(np.int64)
    tru = agg["tru"].to_numpy(np.int64)
    obs = agg["obs"].to_numpy(np.int64)
    est = 500 * (4 * obs - n)
    err = 10_000 * np.abs(est - 1000 * tru) \
        // np.maximum(1000 * tru, 1)
    return pd.DataFrame({
        "o_orderstatus": agg["st"], "n_orders": n, "true_cnt": tru,
        "reported_cnt": obs, "est_milli": est, "err_bps": err}) \
        .astype({c: "int64" for c in ("n_orders", "true_cnt",
                                      "reported_cnt", "est_milli",
                                      "err_bps")})


def orders_max_drawdown(sf_dir: str) -> pd.DataFrame:
    """MAX DRAWDOWN of the cumulative daily-revenue curve — the
    risk-desk metric re-aimed at pipeline throughput: how far below
    its best-ever running total the revenue stream sinks, in exact
    cents. Peak day is the FIRST day attaining the running max that
    the first-deepest trough hangs from; the underwater streak is the
    longest run of consecutive OBSERVED days with positive drawdown
    (gaps-and-islands on the row sequence, mirrored by the twin's
    rn − ROW_NUMBER() grouping). Per-block daily partials — ZERO
    shuffle; cumsum/cummax on the calendar-bounded day grid."""
    ds = _read(sf_dir, "orders", columns=["o_orderdate", "o_totalprice"])

    def partial(t: pa.Table) -> pa.Table:
        dy = t.column("o_orderdate").cast(pa.int64()).to_numpy() \
            // 86_400_000_000
        rev = np.floor(t.column("o_totalprice").to_numpy() * 100) \
            .astype(np.int64)
        u, inv = np.unique(dy, return_inverse=True)
        return pa.table({
            "dy": pa.array(u),
            "rev": pa.array(np.bincount(inv, weights=rev,
                                        minlength=len(u))
                            .astype(np.int64))})

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    agg = (parts.groupby("dy", as_index=False)["rev"].sum()
           .sort_values("dy", kind="mergesort"))
    d = agg["dy"].to_numpy(np.int64)
    r = agg["rev"].to_numpy(np.int64)
    cum = r.cumsum()
    runmax = np.maximum.accumulate(cum)
    dd = runmax - cum
    mdd = int(dd.max())
    trough_i = int(np.argmax(dd == mdd))
    peak_i = int(np.argmax(cum == runmax[trough_i]))
    under = dd > 0
    # longest run of consecutive True rows
    brk = np.concatenate(([True], ~under[:-1]))
    run_id = np.cumsum(brk & under)
    streak = 0
    if under.any():
        streak = int(np.bincount(run_id[under]).max())
    return pd.DataFrame([(len(d), mdd, int(d[peak_i]),
                          int(d[trough_i]), streak)],
                        columns=["n_days", "max_drawdown_cents",
                                 "peak_dy", "trough_dy",
                                 "longest_underwater_days"]) \
        .astype("int64")


def orders_mann_kendall(sf_dir: str) -> pd.DataFrame:
    """MANN–KENDALL trend test on the daily revenue series — the
    nonparametric is-there-a-trend gate that pairs with the Theil–Sen
    slope: S = Σ_{i<j} sgn(revⱼ − revᵢ) as an exact integer over the
    O(G²) day-grid pair sweep (calendar-bounded, never on rows), the
    tie-corrected variance kept as the exact integer 18·Var =
    n(n−1)(2n+5) − Σ t(t−1)(2t+5), and the continuity-corrected z
    as ONE IEEE-order-matched float expression
    (S∓1)/sqrt(var18/18.0)·1000 floored to milli units. Per-block
    daily partials — ZERO shuffle."""
    import math

    ds = _read(sf_dir, "orders", columns=["o_orderdate", "o_totalprice"])

    def partial(t: pa.Table) -> pa.Table:
        dy = t.column("o_orderdate").cast(pa.int64()).to_numpy() \
            // 86_400_000_000
        rev = np.floor(t.column("o_totalprice").to_numpy() * 100) \
            .astype(np.int64)
        u, inv = np.unique(dy, return_inverse=True)
        return pa.table({
            "dy": pa.array(u),
            "rev": pa.array(np.bincount(inv, weights=rev,
                                        minlength=len(u))
                            .astype(np.int64))})

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    agg = (parts.groupby("dy", as_index=False)["rev"].sum()
           .sort_values("dy", kind="mergesort"))
    r = agg["rev"].to_numpy(np.int64)
    n = len(r)
    i, j = np.triu_indices(n, k=1)
    diff = r[j] - r[i]
    s = int(np.sign(diff).sum())
    _, counts = np.unique(r, return_counts=True)
    t_ = counts[counts > 1].astype(np.int64)
    tie_term = int((t_ * (t_ - 1) * (2 * t_ + 5)).sum())
    var18 = n * (n - 1) * (2 * n + 5) - tie_term
    if s > 0:
        z_milli = math.floor(
            float(s - 1) / math.sqrt(float(var18) / 18.0) * 1000.0)
    elif s < 0:
        z_milli = math.floor(
            float(s + 1) / math.sqrt(float(var18) / 18.0) * 1000.0)
    else:
        z_milli = 0
    return pd.DataFrame([(n, s, tie_term, var18, z_milli)],
                        columns=["n_days", "s_stat", "tie_term",
                                 "var_x18", "z_milli"]) \
        .astype("int64")


def orders_kendall_tau(sf_dir: str) -> pd.DataFrame:
    """KENDALL TAU-B between the daily ORDER-COUNT series and the
    daily REVENUE series — the rank-association companion to the
    Spearman/Mann-Kendall pair: do busier days also gross more, with
    no linearity assumption? Concordant/discordant pair counts are
    exact integers over the O(G^2) observed-day pair sweep (G is the
    calendar, never the rows), tie corrections tx/ty are exact pair
    counts from the value multiplicities, and the only float on
    either side is the ONE IEEE-order-matched closing expression
    S / (sqrt(n0-tx)*sqrt(n0-ty)) * 1000 floored to milli units.
    Per-block daily partials — ZERO shuffle."""
    import math

    ds = _read(sf_dir, "orders", columns=["o_orderdate", "o_totalprice"])

    def partial(t: pa.Table) -> pa.Table:
        dy = t.column("o_orderdate").cast(pa.int64()).to_numpy() \
            // 86_400_000_000
        rev = np.floor(t.column("o_totalprice").to_numpy() * 100) \
            .astype(np.int64)
        u, inv = np.unique(dy, return_inverse=True)
        return pa.table({
            "dy": pa.array(u),
            "cnt": pa.array(np.bincount(inv, minlength=len(u))
                            .astype(np.int64)),
            "rev": pa.array(np.bincount(inv, weights=rev,
                                        minlength=len(u))
                            .astype(np.int64))})

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    agg = (parts.groupby("dy", as_index=False)[["cnt", "rev"]].sum()
           .sort_values("dy", kind="mergesort"))
    x = agg["cnt"].to_numpy(np.int64)
    y = agg["rev"].to_numpy(np.int64)
    g = len(x)
    i, j = np.triu_indices(g, k=1)
    sx = np.sign(x[j] - x[i])
    sy = np.sign(y[j] - y[i])
    prod = sx * sy
    conc = int((prod > 0).sum())
    disc = int((prod < 0).sum())
    s = conc - disc
    n0 = g * (g - 1) // 2
    _, cx = np.unique(x, return_counts=True)
    tx = int((cx * (cx - 1) // 2).sum())
    _, cy = np.unique(y, return_counts=True)
    ty = int((cy * (cy - 1) // 2).sum())
    if n0 - tx > 0 and n0 - ty > 0:
        tau_milli = math.floor(
            float(s) / (math.sqrt(float(n0 - tx))
                        * math.sqrt(float(n0 - ty))) * 1000.0)
    else:
        tau_milli = 0
    return pd.DataFrame([(g, conc, disc, s, tx, ty, tau_milli)],
                        columns=["n_days", "concordant", "discordant",
                                 "s_stat", "tx_pairs", "ty_pairs",
                                 "tau_milli"]).astype("int64")


def events_turning_points(sf_dir: str) -> pd.DataFrame:
    """TURNING-POINT randomness test on the daily event-count series
    — the third classic trend/randomness gate beside the up-down runs
    and Mann-Kendall tests: count interior days that are a strict
    local peak or trough of the observed-day sequence ((x_i - x_{i-1})
    *(x_{i+1} - x_i) < 0; flat shoulders audit separately as ties),
    compare against the i.i.d. expectation 2(n-2)/3 with variance
    (16n-29)/90, both kept as exact scaled integers, and close with
    ONE IEEE-order-matched float z = (T - E)/sqrt(V) floored to milli
    units. Per-block daily count partials — ZERO shuffle."""
    import math

    ds = _read(sf_dir, "events", columns=["ts"])

    def partial(t: pa.Table) -> pa.Table:
        dy = t.column("ts").cast(pa.int64()).to_numpy() \
            // 86_400_000_000
        u, cnt = np.unique(dy, return_counts=True)
        return pa.table({"dy": pa.array(u),
                         "cnt": pa.array(cnt.astype(np.int64))})

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    agg = (parts.groupby("dy", as_index=False)["cnt"].sum()
           .sort_values("dy", kind="mergesort"))
    c = agg["cnt"].to_numpy(np.int64)
    n = len(c)
    d1 = c[1:-1] - c[:-2]
    d2 = c[2:] - c[1:-1]
    prod = d1 * d2
    tp = int((prod < 0).sum())
    tz = int((prod == 0).sum())
    exp_x3 = 2 * (n - 2)
    var_x90 = 16 * n - 29
    z_milli = math.floor(
        float(3 * tp - exp_x3) / 3.0
        / math.sqrt(float(var_x90) / 90.0) * 1000.0)
    return pd.DataFrame([(n, tp, tz, exp_x3, var_x90, z_milli)],
                        columns=["n_days", "turning_points",
                                 "flat_ties", "exp_x3", "var_x90",
                                 "z_milli"]).astype("int64")


def part_brand_type_cramer(sf_dir: str) -> pd.DataFrame:
    """CRAMER'S V categorical association between part brand and
    part type — the contingency-table independence gate for catalog
    columns: chi-square accumulated as exact per-cell integer milli
    contributions floor(1000*(N*O - r*c)^2 / (N*r*c)) over the FULL
    brand x type grid (absent cells included via the margins cross
    join, exactly as the twin's LEFT JOIN), so the sum is order-free
    and bit-exact; the only float on either side is the ONE closing
    IEEE-order-matched sqrt(chi2/1000/ (N*min(r-1,c-1)))*1000 floor.
    Per-block (brand, type) count partials — the grid is 25 x 6, so
    the exchange is constant-size; ZERO row shuffle."""
    import math

    ds = _read(sf_dir, "part", columns=["p_brand", "p_type"])

    def partial(t: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "b": np.asarray(t.column("p_brand")).astype(object),
            "t": np.asarray(t.column("p_type")).astype(object)})
        g = df.groupby(["b", "t"], as_index=False).size()
        return pa.table({"b": pa.array(g["b"], type=pa.string()),
                         "t": pa.array(g["t"], type=pa.string()),
                         "o": pa.array(g["size"].to_numpy(np.int64))})

    obs = (ds.map_batches(partial, batch_format="pyarrow")
           .to_pandas().groupby(["b", "t"], as_index=False)["o"].sum())
    rb = obs.groupby("b")["o"].sum().to_dict()
    ct = obs.groupby("t")["o"].sum().to_dict()
    omap = {(r["b"], r["t"]): int(r["o"]) for _, r in obs.iterrows()}
    n = sum(int(v) for v in rb.values())
    chi2m = 0
    for b, r in rb.items():
        for t, c in ct.items():
            o = omap.get((b, t), 0)
            num = n * o - int(r) * int(c)
            chi2m += 1000 * num * num // (n * int(r) * int(c))
    nb, nt = len(rb), len(ct)
    dof = (nb - 1) * (nt - 1)
    mind = min(nb - 1, nt - 1)
    v_milli = math.floor(math.sqrt(
        float(chi2m) / 1000.0 / float(n * mind)) * 1000.0)
    return pd.DataFrame([(n, nb, nt, dof, chi2m, v_milli)],
                        columns=["n_parts", "n_brands", "n_types",
                                 "dof", "chi2_milli", "v_milli"]) \
        .astype("int64")


def orders_dow_anova(sf_dir: str) -> pd.DataFrame:
    """INTEGER one-way ANOVA of the daily revenue series across the
    seven weekdays — the significance side of the day-of-week effect:
    each observed day's revenue (exact cents) is a sample, groups are
    the pure-integer weekday (epoch_days+3)%7, group means are
    FLOORED to milli-cents so between/within sums of squares stay
    exact integers (SSW_i = 10^6*Q_i - 2*m_i*1000*S_i + n_i*m_i^2 per
    group), and the F statistic closes fully inside integer
    arithmetic: F_milli = 1000*SSB*(N-k) // (SSW*(k-1)) — NO float on
    either side. Squares of daily cents exceed int64, so the driver
    folds Python bigints and the twin rides HUGEINT. Per-block daily
    partials — ZERO shuffle."""
    ds = _read(sf_dir, "orders", columns=["o_orderdate", "o_totalprice"])

    def partial(t: pa.Table) -> pa.Table:
        dy = t.column("o_orderdate").cast(pa.int64()).to_numpy() \
            // 86_400_000_000
        rev = np.floor(t.column("o_totalprice").to_numpy() * 100) \
            .astype(np.int64)
        u, inv = np.unique(dy, return_inverse=True)
        return pa.table({
            "dy": pa.array(u),
            "rev": pa.array(np.bincount(inv, weights=rev,
                                        minlength=len(u))
                            .astype(np.int64))})

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    agg = parts.groupby("dy", as_index=False)["rev"].sum()
    dy = agg["dy"].to_numpy(np.int64)
    rv = agg["rev"].to_numpy(np.int64)
    dow = (dy + 3) % 7
    stats = {}
    for w in range(7):
        sel = rv[dow == w]
        if len(sel):
            stats[w] = (len(sel), sum(int(x) for x in sel),
                        sum(int(x) * int(x) for x in sel))
    n = sum(s[0] for s in stats.values())
    k = len(stats)
    s_tot = sum(s[1] for s in stats.values())
    mbar = 1000 * s_tot // n
    ssb = 0
    ssw = 0
    best = worst = None
    for w in sorted(stats):
        n_i, s_i, q_i = stats[w]
        m_i = 1000 * s_i // n_i
        ssb += n_i * (m_i - mbar) * (m_i - mbar)
        ssw += 1_000_000 * q_i - 2 * m_i * 1000 * s_i + n_i * m_i * m_i
        if best is None or m_i > best[1]:
            best = (w, m_i)
        if worst is None or m_i < worst[1]:
            worst = (w, m_i)
    f_milli = 1000 * ssb * (n - k) // (ssw * (k - 1))
    eta2_bps = 10_000 * ssb // (ssb + ssw)
    return pd.DataFrame([(n, k, f_milli, eta2_bps,
                          best[0], worst[0])],
                        columns=["n_days", "n_groups", "f_milli",
                                 "eta2_bps", "best_dow", "worst_dow"]) \
        .astype("int64")


def lineitem_quantity_ks_uniform(sf_dir: str) -> pd.DataFrame:
    """ONE-SAMPLE KOLMOGOROV-SMIRNOV test of the quantity column
    against its nominal discrete Uniform{1..50} generator — the
    does-the-data-match-spec gate run entirely in integers: the sup
    gap is max over the FULL 1..50 grid (absent levels included) of
    |50*cum_n(q) - q*N| in 1/(50N) units, its first-attaining level
    is the argmax tie-broken low, d_milli = 1000*d // (50N) exactly,
    and the only float is the ONE IEEE-order-matched closing
    d/(50N)*sqrt(N)*1000 Kolmogorov lambda. Per-block 50-cell
    bincount partials — constant-size exchange, ZERO shuffle."""
    import math

    ds = _read(sf_dir, "lineitem", columns=["l_quantity"])

    def partial(t: pa.Table) -> pa.Table:
        q = t.column("l_quantity").to_numpy().astype(np.int64)
        cnt = np.bincount(q, minlength=51)[1:51].astype(np.int64)
        return pa.table({"q": pa.array(np.arange(1, 51, dtype=np.int64)),
                         "c": pa.array(cnt)})

    agg = (ds.map_batches(partial, batch_format="pyarrow")
           .to_pandas().groupby("q", as_index=False)["c"].sum()
           .sort_values("q"))
    c = agg["c"].to_numpy(np.int64)
    n = int(c.sum())
    cum = c.cumsum()
    q = np.arange(1, 51, dtype=np.int64)
    dv = np.abs(50 * cum - q * n)
    d_num = int(dv.max())
    q_at_max = int(q[int(np.argmax(dv))])
    d_milli = 1000 * d_num // (50 * n)
    lam_milli = math.floor(
        float(d_num) / (50.0 * float(n))
        * math.sqrt(float(n)) * 1000.0)
    return pd.DataFrame([(n, d_num, q_at_max, d_milli, lam_milli)],
                        columns=["n_lines", "d_num", "q_at_max",
                                 "d_milli", "ks_lambda_milli"]) \
        .astype("int64")


def customer_segment_kruskal(sf_dir: str) -> pd.DataFrame:
    """KRUSKAL-WALLIS H across the five market segments on customer
    account balance — the k-sample rank test completing the MWU /
    ANOVA family, exact end to end: global midranks come from a
    value-level count fold over the bounded cents domain (doubled
    midrank 2*cum_before + cnt + 1 keeps them integer), per-segment
    rank sums are exact integers, and H closes in pure integer
    arithmetic via the documented per-group floor S = sum_g
    3000*R2_g^2 // n_g then h_milli = S // (N(N+1)) - 3000(N+1)
    (uncorrected for ties; squares exceed int64 so the driver holds
    Python bigints and the twin rides HUGEINT). One (segment, value)
    count exchange at customer cardinality; h_milli repeats on every
    segment row by construction."""
    ds = _read(sf_dir, "customer", columns=["c_mktsegment", "c_acctbal"])

    def partial(t: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "seg": np.asarray(t.column("c_mktsegment")).astype(object),
            "v": np.floor(t.column("c_acctbal").to_numpy() * 100)
            .astype(np.int64)})
        g = df.groupby(["seg", "v"], as_index=False).size()
        return pa.table({"seg": pa.array(g["seg"], type=pa.string()),
                         "v": pa.array(g["v"].to_numpy(np.int64)),
                         "cgv": pa.array(g["size"].to_numpy(np.int64))})

    gv = (ds.map_batches(partial, batch_format="pyarrow")
          .to_pandas().groupby(["seg", "v"], as_index=False)["cgv"]
          .sum())
    vc = gv.groupby("v", as_index=False)["cgv"].sum() \
        .rename(columns={"cgv": "cv"}).sort_values("v")
    vc["cumbef"] = vc["cv"].cumsum() - vc["cv"]
    gv = gv.merge(vc, on="v")
    gv["term"] = gv["cgv"] * (2 * gv["cumbef"] + gv["cv"] + 1)
    r = gv.groupby("seg").agg(n_i=("cgv", "sum"),
                              r2=("term", "sum")).sort_index()
    n = int(r["n_i"].sum())
    s4 = sum(3000 * int(row.r2) * int(row.r2) // int(row.n_i)
             for row in r.itertuples())
    h_milli = s4 // (n * (n + 1)) - 3000 * (n + 1)
    return pd.DataFrame({
        "c_mktsegment": r.index.to_numpy(object),
        "n_cust": r["n_i"].to_numpy(np.int64),
        "rank2_sum": r["r2"].to_numpy(np.int64),
        "mean_rank_milli": (1000 * r["r2"].to_numpy(np.int64))
        // (2 * r["n_i"].to_numpy(np.int64)),
        "h_milli": np.full(len(r), h_milli, dtype=np.int64)}) \
        .reset_index(drop=True)


def supplier_grubbs_extremes(sf_dir: str) -> pd.DataFrame:
    """GRUBBS extreme-value test on supplier account balances — the
    single-most-suspicious-point gate on each tail: exact integer
    moments (N, S, Q as Python bigints / HUGEINT) plus the two tail
    candidates resolved distributively (each block emits its own
    max/min value with the smallest suppkey attaining it; the driver
    folds value-then-key, correct because every row holding the
    global extreme is some block's extreme), deviations N*x - S kept
    exact, and G on each side as ONE IEEE-order-matched float chain
    (dev/N) / sqrt((NQ - S^2)/(N(N-1))) floored to milli. Constant
    per-block partials — ZERO shuffle."""
    import math

    ds = _read(sf_dir, "supplier", columns=["s_suppkey", "s_acctbal"])

    def partial(t: pa.Table) -> pa.Table:
        sk = t.column("s_suppkey").to_numpy().astype(np.int64)
        v = np.floor(t.column("s_acctbal").to_numpy() * 100) \
            .astype(np.int64)
        vmax, vmin = int(v.max()), int(v.min())
        return pa.table({
            "n": pa.array([np.int64(len(v))]),
            "s": pa.array([np.int64(v.sum())]),
            "q": pa.array([np.int64((v * v).sum())]),
            "vmax": pa.array([np.int64(vmax)]),
            "kmax": pa.array([np.int64(sk[v == vmax].min())]),
            "vmin": pa.array([np.int64(vmin)]),
            "kmin": pa.array([np.int64(sk[v == vmin].min())])})

    p = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    n = int(p["n"].sum())
    s = sum(int(x) for x in p["s"])
    q = sum(int(x) for x in p["q"])
    vmax = int(p["vmax"].max())
    kmax = int(p.loc[p["vmax"] == vmax, "kmax"].min())
    vmin = int(p["vmin"].min())
    kmin = int(p.loc[p["vmin"] == vmin, "kmin"].min())
    nq_s2 = n * q - s * s

    def g_milli(dev: int) -> int:
        return math.floor(
            (float(dev) / float(n))
            / math.sqrt(float(nq_s2) / (float(n) * float(n - 1)))
            * 1000.0)

    rows = [("high", n, kmax, vmax, n * vmax - s,
             g_milli(n * vmax - s)),
            ("low", n, kmin, vmin, s - n * vmin,
             g_milli(s - n * vmin))]
    return pd.DataFrame(rows, columns=[
        "side", "n_suppliers", "s_suppkey", "bal_cents", "dev_num",
        "g_milli"]).astype({c: "int64" for c in (
            "n_suppliers", "s_suppkey", "bal_cents", "dev_num",
            "g_milli")})


def nation_segment_stdres(sf_dir: str) -> pd.DataFrame:
    """STANDARDIZED-RESIDUAL diagnostics on the customer nation x
    market-segment contingency grid — which specific cells drive the
    association, not just whether one exists: the full margins grid
    (absent cells included at O = 0), exact integer deviations
    N*O - r*c, each cell's haberman residual (dev/N) /
    sqrt(rc/N * (1 - r/N) * (1 - c/N)) as an independent
    IEEE-order-matched float floored to milli (NO float ever summed),
    ranked by |stdres_milli| desc with the (nation, segment) lexical
    tie rule, top 10. Per-block (nation, segment) count partials —
    the grid is 25 x 5; ZERO row shuffle."""
    import math

    ds = _read(sf_dir, "customer",
               columns=["c_nationkey", "c_mktsegment"])

    def partial(t: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "nk": t.column("c_nationkey").to_numpy()
            .astype(np.int64),
            "seg": np.asarray(t.column("c_mktsegment"))
            .astype(object)})
        g = df.groupby(["nk", "seg"], as_index=False).size()
        return pa.table({"nk": pa.array(g["nk"].to_numpy(np.int64)),
                         "seg": pa.array(g["seg"], type=pa.string()),
                         "o": pa.array(g["size"].to_numpy(np.int64))})

    obs = (ds.map_batches(partial, batch_format="pyarrow")
           .to_pandas().groupby(["nk", "seg"], as_index=False)["o"]
           .sum())
    rtot = obs.groupby("nk")["o"].sum().to_dict()
    ctot = obs.groupby("seg")["o"].sum().to_dict()
    omap = {(r["nk"], r["seg"]): int(r["o"])
            for _, r in obs.iterrows()}
    n = sum(int(v) for v in rtot.values())
    cells = []
    for nk in sorted(rtot):
        r = int(rtot[nk])
        for seg in sorted(ctot):
            c = int(ctot[seg])
            o = omap.get((nk, seg), 0)
            dev = n * o - r * c
            sr = math.floor(
                (float(dev) / float(n))
                / math.sqrt(float(r * c) / float(n)
                            * (1.0 - float(r) / float(n))
                            * (1.0 - float(c) / float(n)))
                * 1000.0)
            cells.append((nk, seg, o, r, c, dev, sr))
    cells.sort(key=lambda x: (-abs(x[6]), x[0], x[1]))
    top = cells[:10]
    df = pd.DataFrame(top, columns=[
        "c_nationkey", "c_mktsegment", "obs", "r_tot", "c_tot",
        "dev_num", "stdres_milli"])
    df["rk"] = np.arange(1, len(df) + 1, dtype=np.int64)
    return df.astype({c: "int64" for c in (
        "c_nationkey", "obs", "r_tot", "c_tot", "dev_num",
        "stdres_milli", "rk")})


def part_price_tukey_fences(sf_dir: str) -> pd.DataFrame:
    """TUKEY-FENCE outlier census of part retail prices WITHIN each
    brand — the box-plot rule run exactly: per-brand Q1/Q3 via the
    ceil-rank discrete quantile (the same rule quantile_disc
    implements), fences kept integral by working in quarter-cents
    (lo4 = 4*Q1 - 6*IQR, hi4 = 4*Q3 + 6*IQR, outlier iff 4*v strictly
    outside), so the whole operator is pure integer arithmetic.
    Per-block (brand, cents) count partials fold to a
    brand-x-distinct-price grid at most part-cardinality wide; the
    quantile scan runs per brand on the driver grid — ZERO row
    shuffle, no sort of the raw table."""
    ds = _read(sf_dir, "part", columns=["p_brand", "p_retailprice"])

    def partial(t: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "br": np.asarray(t.column("p_brand")).astype(object),
            "v": np.floor(t.column("p_retailprice").to_numpy() * 100)
            .astype(np.int64)})
        g = df.groupby(["br", "v"], as_index=False).size()
        return pa.table({"br": pa.array(g["br"], type=pa.string()),
                         "v": pa.array(g["v"].to_numpy(np.int64)),
                         "c": pa.array(g["size"].to_numpy(np.int64))})

    hist = (ds.map_batches(partial, batch_format="pyarrow")
            .to_pandas().groupby(["br", "v"], as_index=False)["c"]
            .sum())
    rows = []
    for br, g in hist.groupby("br"):
        g = g.sort_values("v", kind="mergesort")
        v = g["v"].to_numpy(np.int64)
        cum = g["c"].to_numpy(np.int64).cumsum()
        n = int(cum[-1])
        q1 = int(v[np.searchsorted(cum, -(-n // 4))])
        q3 = int(v[np.searchsorted(cum, -(-3 * n // 4))])
        iqr = q3 - q1
        lo4, hi4 = 4 * q1 - 6 * iqr, 4 * q3 + 6 * iqr
        lo_cnt = int(g["c"].to_numpy(np.int64)[4 * v < lo4].sum())
        hi_cnt = int(g["c"].to_numpy(np.int64)[4 * v > hi4].sum())
        rows.append((str(br), n, q1, q3, iqr, lo_cnt, hi_cnt))
    rows.sort()
    return pd.DataFrame(rows, columns=[
        "p_brand", "n_parts", "q1_cents", "q3_cents", "iqr_cents",
        "lo_outliers", "hi_outliers"]).astype(
        {c: "int64" for c in ("n_parts", "q1_cents", "q3_cents",
                              "iqr_cents", "lo_outliers",
                              "hi_outliers")})


def orders_runs_median(sf_dir: str) -> pd.DataFrame:
    """WALD-WOLFOWITZ runs test ABOUT THE MEDIAN on the daily revenue
    series — the randomness gate that completes the runs family (the
    up-down variant tests direction, this one tests level): the
    median is the exact ceil-rank daily value, equal-to-median days
    drop (the classic rule), runs count over the day-ordered binary
    above/below sequence, expectation 1 + 2*n1*n2/n and variance
    2n1n2(2n1n2-n)/(n^2(n-1)) kept as exact integer numerators, z as
    ONE IEEE-order-matched float chain floored to milli (0 via the
    integer gate when either side is empty). Per-block daily
    partials — ZERO shuffle."""
    import math

    ds = _read(sf_dir, "orders", columns=["o_orderdate", "o_totalprice"])

    def partial(t: pa.Table) -> pa.Table:
        dy = t.column("o_orderdate").cast(pa.int64()).to_numpy() \
            // 86_400_000_000
        rev = np.floor(t.column("o_totalprice").to_numpy() * 100) \
            .astype(np.int64)
        u, inv = np.unique(dy, return_inverse=True)
        return pa.table({
            "dy": pa.array(u),
            "rev": pa.array(np.bincount(inv, weights=rev,
                                        minlength=len(u))
                            .astype(np.int64))})

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    agg = (parts.groupby("dy", as_index=False)["rev"].sum()
           .sort_values("dy", kind="mergesort"))
    r = agg["rev"].to_numpy(np.int64)
    g = len(r)
    srt = np.sort(r)
    med = int(srt[-(-g // 2) - 1])
    keep = r[r != med]
    dropped = g - len(keep)
    a = (keep > med).astype(np.int64)
    n1 = int(a.sum())
    n2 = len(a) - n1
    n = n1 + n2
    runs = int(1 + (a[1:] != a[:-1]).sum()) if n else 0
    p2 = 2 * n1 * n2
    vnum = p2 * (p2 - n)
    if n1 == 0 or n2 == 0 or n < 2 or vnum <= 0:
        z_milli = 0
    else:
        z_milli = math.floor(
            (float(n * runs - n - p2) / float(n))
            / math.sqrt(float(vnum)
                        / (float(n) * float(n) * float(n - 1)))
            * 1000.0)
    return pd.DataFrame([(n, dropped, n1, n2, med, runs, z_milli)],
                        columns=["n_days_used", "n_equal_dropped",
                                 "n_above", "n_below", "median_cents",
                                 "runs", "z_milli"]).astype("int64")


def orders_friedman_dow(sf_dir: str) -> pd.DataFrame:
    """FRIEDMAN blocked rank test of the weekday effect — the
    nonparametric two-way companion to the weekday ANOVA: each
    COMPLETE calendar week (all 7 days observed; Monday-start via the
    pure-integer (dy+3)//7 block id) is a block, daily revenues rank
    within their week as exact DOUBLED midranks 2*rank_min + t - 1,
    per-weekday rank sums fold across blocks, and Q closes in pure
    integer arithmetic q_milli = 3000*S // (b*k*(k+1)) - 3000*b*(k+1)
    with S = sum_j R2_j^2 (no float on either side; zero-block gate
    reports -1 weekdays and 0). Per-block daily partials — ZERO
    shuffle; ranking runs on the driver's week grid."""
    ds = _read(sf_dir, "orders", columns=["o_orderdate", "o_totalprice"])

    def partial(t: pa.Table) -> pa.Table:
        dy = t.column("o_orderdate").cast(pa.int64()).to_numpy() \
            // 86_400_000_000
        rev = np.floor(t.column("o_totalprice").to_numpy() * 100) \
            .astype(np.int64)
        u, inv = np.unique(dy, return_inverse=True)
        return pa.table({
            "dy": pa.array(u),
            "rev": pa.array(np.bincount(inv, weights=rev,
                                        minlength=len(u))
                            .astype(np.int64))})

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    agg = parts.groupby("dy", as_index=False)["rev"].sum()
    dy = agg["dy"].to_numpy(np.int64)
    rev = agg["rev"].to_numpy(np.int64)
    wk = (dy + 3) // 7
    dow = (dy + 3) % 7
    uw, wcnt = np.unique(wk, return_counts=True)
    complete = set(uw[wcnt == 7].tolist())
    k = 7
    r2s = {j: 0 for j in range(k)}
    b = 0
    for w in sorted(complete):
        sel = wk == w
        rv = rev[sel]
        dw = dow[sel]
        b += 1
        for idx in range(7):
            v = rv[idx]
            rank_min = int((rv < v).sum()) + 1
            t_ties = int((rv == v).sum())
            r2s[int(dw[idx])] += 2 * rank_min + t_ties - 1
    if b == 0:
        return pd.DataFrame([(0, 0, 0, -1, -1)],
                            columns=["n_weeks", "n_days_used",
                                     "q_milli", "best_dow",
                                     "worst_dow"]).astype("int64")
    s2 = sum(v * v for v in r2s.values())
    q_milli = 3000 * s2 // (b * k * (k + 1)) - 3000 * b * (k + 1)
    best = max(range(k), key=lambda j: (r2s[j], -j))
    worst = min(range(k), key=lambda j: (r2s[j], j))
    return pd.DataFrame([(b, 7 * b, q_milli, best, worst)],
                        columns=["n_weeks", "n_days_used", "q_milli",
                                 "best_dow", "worst_dow"]) \
        .astype("int64")


def orders_variance_ratio(sf_dir: str) -> pd.DataFrame:
    """LO-MACKINLAY VARIANCE RATIO VR(7) of the daily revenue series
    — does weekly aggregation scale variance linearly (random-walk
    increments) or reveal mean reversion/momentum: variance of the
    complete-week sums against 7x the variance of the member days,
    both as exact integer central-moment numerators n*Q - S^2 (weekly
    sums square past int64, so the driver folds Python bigints and
    the twin rides HUGEINT), closed by ONE exact cross-multiplied
    integer division vr_milli = 1000*A*n1^2 // (7*B*nq^2) — NO float
    on either side. Shares the complete-week block notion with the
    Friedman gate; per-block daily partials, ZERO shuffle."""
    ds = _read(sf_dir, "orders", columns=["o_orderdate", "o_totalprice"])

    def partial(t: pa.Table) -> pa.Table:
        dy = t.column("o_orderdate").cast(pa.int64()).to_numpy() \
            // 86_400_000_000
        rev = np.floor(t.column("o_totalprice").to_numpy() * 100) \
            .astype(np.int64)
        u, inv = np.unique(dy, return_inverse=True)
        return pa.table({
            "dy": pa.array(u),
            "rev": pa.array(np.bincount(inv, weights=rev,
                                        minlength=len(u))
                            .astype(np.int64))})

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    agg = parts.groupby("dy", as_index=False)["rev"].sum()
    dy = agg["dy"].to_numpy(np.int64)
    rev = agg["rev"].to_numpy(np.int64)
    wk = (dy + 3) // 7
    uw, wcnt = np.unique(wk, return_counts=True)
    keep = np.isin(wk, uw[wcnt == 7])
    rv = rev[keep]
    wkk = wk[keep]
    uw2, inv2 = np.unique(wkk, return_inverse=True)
    nq = len(uw2)
    if nq < 2:
        return pd.DataFrame([(nq, int(keep.sum()), 0)],
                            columns=["n_weeks", "n_days",
                                     "vr_milli"]).astype("int64")
    wsum = [int(x) for x in
            np.bincount(inv2, weights=rv, minlength=nq)
            .astype(np.int64)]
    sq = sum(wsum)
    qq = sum(w * w for w in wsum)
    n1 = len(rv)
    s1 = sum(int(x) for x in rv)
    q1 = sum(int(x) * int(x) for x in rv)
    a = nq * qq - sq * sq
    bb = n1 * q1 - s1 * s1
    vr_milli = (1000 * a * n1 * n1 // (7 * bb * nq * nq)
                if bb > 0 else 0)
    return pd.DataFrame([(nq, n1, vr_milli)],
                        columns=["n_weeks", "n_days", "vr_milli"]) \
        .astype("int64")


def lineitem_cohen_kappa(sf_dir: str) -> pd.DataFrame:
    """COHEN'S KAPPA agreement between two binary line "raters" — the
    deep-discount flag (discount >= 5%) and the high-tax flag (tax >=
    4%): beyond-chance agreement from the 2x2 confusion grid in PURE
    integer arithmetic, kappa = (N*(n11+n00) - r1*c1 - r0*c0) /
    (N^2 - r1*c1 - r0*c0) closed as a sign-normalized milli division
    sgn * (1000*|num| // den) so the numpy-floor vs DuckDB-truncate
    mismatch on negatives never bites. Integer-cents thresholds (bps
    of the raw decimals), 4-cell per-block bincount partials — ZERO
    shuffle."""
    ds = _read(sf_dir, "lineitem", columns=["l_discount", "l_tax"])

    def partial(t: pa.Table) -> pa.Table:
        disc = np.floor(t.column("l_discount").to_numpy() * 10000) \
            .astype(np.int64)
        tax = np.floor(t.column("l_tax").to_numpy() * 10000) \
            .astype(np.int64)
        a = (disc >= 500).astype(np.int64)
        b = (tax >= 400).astype(np.int64)
        cell = 2 * a + b
        cnt = np.bincount(cell, minlength=4).astype(np.int64)
        return pa.table({"cell": pa.array(np.arange(4, dtype=np.int64)),
                         "n": pa.array(cnt)})

    agg = (ds.map_batches(partial, batch_format="pyarrow")
           .to_pandas().groupby("cell", as_index=False)["n"].sum()
           .sort_values("cell"))
    c = agg["n"].to_numpy(np.int64)
    n00, n01, n10, n11 = (int(c[0]), int(c[1]), int(c[2]), int(c[3]))
    n = n00 + n01 + n10 + n11
    r1, r0 = n10 + n11, n00 + n01
    c1, c0 = n01 + n11, n00 + n10
    num = n * (n11 + n00) - r1 * c1 - r0 * c0
    den = n * n - r1 * c1 - r0 * c0
    sgn = 1 if num >= 0 else -1
    kappa_milli = sgn * (1000 * abs(num) // den) if den > 0 else 0
    po_bps = 10_000 * (n11 + n00) // n
    pe_bps = 10_000 * (r1 * c1 + r0 * c0) // (n * n)
    return pd.DataFrame([(n, n11, n10, n01, n00, po_bps, pe_bps,
                          kappa_milli)],
                        columns=["n_lines", "n_both", "n_disc_only",
                                 "n_tax_only", "n_neither", "po_bps",
                                 "pe_bps", "kappa_milli"]) \
        .astype("int64")


def events_mcnemar_halves(sf_dir: str) -> pd.DataFrame:
    """McNEMAR paired test of user activity flip between the two
    calendar halves of the event stream — did the population's
    active-set change more than symmetric churn would allow: each
    user contributes one (active-in-H1, active-in-H2) pair (halves
    split at the integer midpoint day of the observed span), the
    test consumes only the DISCORDANT counts b (H1-only) and c
    (H2-only), and the continuity-corrected statistic closes in pure
    integers chi2_milli = 1000*(|b-c|-1)^2 // (b+c) with the b+c=0
    gate. Global span from a constant min/max partial; per-user
    OR-flags fold through one user%64-bucketed exchange."""
    ds = _read(sf_dir, "events", columns=["ts", "user_id"])

    def span(t: pa.Table) -> pa.Table:
        d = t.column("ts").cast(pa.int64()).to_numpy() \
            // 86_400_000_000
        return pa.table({"lo": pa.array([np.int64(d.min())]),
                         "hi": pa.array([np.int64(d.max())])})

    sp = ds.map_batches(span, batch_format="pyarrow").to_pandas()
    lo, hi = int(sp["lo"].min()), int(sp["hi"].max())
    mid = (lo + hi) // 2

    def flags(t: pa.Table) -> pa.Table:
        d = t.column("ts").cast(pa.int64()).to_numpy() \
            // 86_400_000_000
        u = t.column("user_id").to_numpy().astype(np.int64)
        h2 = (d > mid).astype(np.int64)
        df = pd.DataFrame({"u": u, "h1": 1 - h2, "h2": h2})
        g = df.groupby("u", as_index=False).max()
        g["bk"] = g["u"] % 64
        return pa.table({"bk": pa.array(g["bk"].to_numpy(np.int64)),
                         "u": pa.array(g["u"].to_numpy(np.int64)),
                         "h1": pa.array(g["h1"].to_numpy(np.int64)),
                         "h2": pa.array(g["h2"].to_numpy(np.int64))})

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        gg = g.groupby("u", as_index=False)[["h1", "h2"]].max()
        both = int(((gg["h1"] == 1) & (gg["h2"] == 1)).sum())
        h1o = int(((gg["h1"] == 1) & (gg["h2"] == 0)).sum())
        h2o = int(((gg["h1"] == 0) & (gg["h2"] == 1)).sum())
        return pd.DataFrame({"both": [both], "h1o": [h1o],
                             "h2o": [h2o]})

    p = (ds.map_batches(flags, batch_format="pyarrow")
         .groupby("bk").map_groups(fold, batch_format="pandas")
         .to_pandas())
    both = int(p["both"].sum())
    b = int(p["h1o"].sum())
    c = int(p["h2o"].sum())
    n_users = both + b + c
    if b + c == 0:
        chi2_milli = 0
    else:
        d = abs(b - c) - 1
        chi2_milli = 1000 * d * d // (b + c)
    return pd.DataFrame([(n_users, mid, both, b, c, chi2_milli)],
                        columns=["n_users", "mid_day", "n_both",
                                 "n_h1_only", "n_h2_only",
                                 "chi2_milli"]).astype("int64")


def part_price_skew_kurtosis(sf_dir: str) -> pd.DataFrame:
    """HIGHER-MOMENT shape profile of retail prices per brand —
    skewness and excess kurtosis from EXACT integer raw moments: the
    same (brand, cents) histogram fold as the Tukey fences feeds
    Python-bigint sums S..Q4 (third/fourth powers of cents pass
    int64, the twin rides HUGEINT), central-moment numerators close
    exactly (M2 = N*Q2 - S^2, M3 = N^2*Q3 - 3N*Q2*S + 2S^3, M4 =
    N^3*Q4 - 4N^2*Q3*S + 6N*Q2*S^2 - 3S^4, so skew = M3/M2^1.5 and
    kurt = M4/M2^2 need no N factor), excess kurtosis is a PURE
    integer 1000*M4 // M2^2 - 3000, and skewness is the ONE
    IEEE-order-matched float chain (M3/M2)/sqrt(M2)*1000 floored.
    ZERO row shuffle."""
    import math

    ds = _read(sf_dir, "part", columns=["p_brand", "p_retailprice"])

    def partial(t: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "br": np.asarray(t.column("p_brand")).astype(object),
            "v": np.floor(t.column("p_retailprice").to_numpy() * 100)
            .astype(np.int64)})
        g = df.groupby(["br", "v"], as_index=False).size()
        return pa.table({"br": pa.array(g["br"], type=pa.string()),
                         "v": pa.array(g["v"].to_numpy(np.int64)),
                         "c": pa.array(g["size"].to_numpy(np.int64))})

    hist = (ds.map_batches(partial, batch_format="pyarrow")
            .to_pandas().groupby(["br", "v"], as_index=False)["c"]
            .sum())
    rows = []
    for br, g in hist.groupby("br"):
        vals = [int(x) for x in g["v"]]
        cnts = [int(x) for x in g["c"]]
        n = sum(cnts)
        s = sum(c * v for c, v in zip(cnts, vals))
        q2 = sum(c * v * v for c, v in zip(cnts, vals))
        q3 = sum(c * v ** 3 for c, v in zip(cnts, vals))
        q4 = sum(c * v ** 4 for c, v in zip(cnts, vals))
        m2 = n * q2 - s * s
        m3 = n * n * q3 - 3 * n * q2 * s + 2 * s ** 3
        m4 = (n ** 3 * q4 - 4 * n * n * q3 * s
              + 6 * n * q2 * s * s - 3 * s ** 4)
        if m2 > 0:
            skew_milli = math.floor(
                float(m3) / float(m2) / math.sqrt(float(m2))
                * 1000.0)
            kurt_ex_milli = 1000 * m4 // (m2 * m2) - 3000
        else:
            skew_milli = 0
            kurt_ex_milli = 0
        rows.append((str(br), n, s // n, m2 // (n * n),
                     skew_milli, kurt_ex_milli))
    rows.sort()
    return pd.DataFrame(rows, columns=[
        "p_brand", "n_parts", "mean_cents", "var_cents2",
        "skew_milli", "kurt_ex_milli"]).astype(
        {c: "int64" for c in ("n_parts", "mean_cents", "var_cents2",
                              "skew_milli", "kurt_ex_milli")})


def lineitem_partial_corr(sf_dir: str) -> pd.DataFrame:
    """PARTIAL CORRELATION of quantity and line price CONTROLLING
    for discount — does the qty-price link survive once the discount
    channel is removed: all ten raw moments fold as one constant
    per-block partial (dollars for price, bps for discount, so every
    per-block int64 sum is safe; the driver re-folds in Python
    bigints), the three pairwise covariance/variance numerators stay
    exact integers, and the closing r_xy.z = (rxy - rxz*ryz) /
    (sqrt(1-rxz^2)*sqrt(1-ryz^2)) is evaluated in the SAME IEEE
    operation order as the twin (each exact integer cast to double
    once, then identical multiply/subtract/sqrt/divide). The three
    pairwise r's also report as independently floored milli columns.
    ZERO shuffle."""
    import math

    ds = _read(sf_dir, "lineitem",
               columns=["l_quantity", "l_extendedprice", "l_discount"])

    def moments(t: pa.Table) -> pa.Table:
        x = np.floor(t.column("l_quantity").to_numpy()) \
            .astype(np.int64)
        y = np.floor(t.column("l_extendedprice").to_numpy()) \
            .astype(np.int64)
        z = np.floor(t.column("l_discount").to_numpy() * 10000) \
            .astype(np.int64)
        return pa.table({k: pa.array([np.int64(v)]) for k, v in (
            ("n", len(x)), ("sx", x.sum()), ("sy", y.sum()),
            ("sz", z.sum()), ("sxx", (x * x).sum()),
            ("syy", (y * y).sum()), ("szz", (z * z).sum()),
            ("sxy", (x * y).sum()), ("sxz", (x * z).sum()),
            ("syz", (y * z).sum()))})

    p = ds.map_batches(moments, batch_format="pyarrow").to_pandas()
    n = int(p["n"].sum())
    sx, sy, sz = (sum(int(v) for v in p[c]) for c in ("sx", "sy",
                                                      "sz"))
    sxx, syy, szz = (sum(int(v) for v in p[c]) for c in ("sxx",
                                                         "syy",
                                                         "szz"))
    sxy, sxz, syz = (sum(int(v) for v in p[c]) for c in ("sxy",
                                                         "sxz",
                                                         "syz"))
    vx, vy, vz = (n * sxx - sx * sx, n * syy - sy * sy,
                  n * szz - sz * sz)
    cxy, cxz, cyz = (n * sxy - sx * sy, n * sxz - sx * sz,
                     n * syz - sy * sz)
    if vx <= 0 or vy <= 0 or vz <= 0:
        rxy = rxz = ryz = pc = 0.0
    else:
        rxy = float(cxy) / (math.sqrt(float(vx))
                            * math.sqrt(float(vy)))
        rxz = float(cxz) / (math.sqrt(float(vx))
                            * math.sqrt(float(vz)))
        ryz = float(cyz) / (math.sqrt(float(vy))
                            * math.sqrt(float(vz)))
        pc = (rxy - rxz * ryz) / (math.sqrt(1.0 - rxz * rxz)
                                  * math.sqrt(1.0 - ryz * ryz))
    return pd.DataFrame([(n, math.floor(rxy * 1000.0),
                          math.floor(rxz * 1000.0),
                          math.floor(ryz * 1000.0),
                          math.floor(pc * 1000.0))],
                        columns=["n_lines", "rxy_milli", "rxz_milli",
                                 "ryz_milli", "pc_milli"]) \
        .astype("int64")


def lineitem_blomqvist_beta(sf_dir: str) -> pd.DataFrame:
    """BLOMQVIST'S BETA (median-quadrant test) between quantity and
    line price — the cheapest robust association check there is, run
    in two genuinely streaming phases: phase 1 folds BOTH value-level
    histograms in one pass (quantity levels + price dollars, a
    bounded grid) and takes exact ceil-rank medians; phase 2
    re-streams the table counting the four strict quadrants around
    (med_x, med_y), dropping on-median rows per the classic rule.
    beta = (concordant - discordant quadrants)/kept closes as a
    sign-normalized integer milli division — NO float anywhere.
    Pure per-block bincount partials in both phases, ZERO shuffle;
    the phase split is inherent (the quadrant predicate depends on
    phase-1 output) and mirrors the twin's quantile_disc."""
    ds = _read(sf_dir, "lineitem",
               columns=["l_quantity", "l_extendedprice"])

    def hists(t: pa.Table) -> pa.Table:
        x = np.floor(t.column("l_quantity").to_numpy()) \
            .astype(np.int64)
        y = np.floor(t.column("l_extendedprice").to_numpy()) \
            .astype(np.int64)
        ux, cx = np.unique(x, return_counts=True)
        uy, cy = np.unique(y, return_counts=True)
        return pa.table({
            "kind": pa.array(np.concatenate(
                [np.zeros(len(ux), dtype=np.int64),
                 np.ones(len(uy), dtype=np.int64)])),
            "v": pa.array(np.concatenate([ux, uy])),
            "c": pa.array(np.concatenate([cx, cy]).astype(np.int64))})

    h = (ds.map_batches(hists, batch_format="pyarrow")
         .to_pandas().groupby(["kind", "v"], as_index=False)["c"]
         .sum())

    def med(kind: int) -> int:
        g = h[h["kind"] == kind].sort_values("v", kind="mergesort")
        cum = g["c"].to_numpy(np.int64).cumsum()
        n = int(cum[-1])
        return int(g["v"].to_numpy(np.int64)[
            np.searchsorted(cum, -(-n // 2))])

    mx, my = med(0), med(1)

    def quadrants(t: pa.Table) -> pa.Table:
        x = np.floor(t.column("l_quantity").to_numpy()) \
            .astype(np.int64)
        y = np.floor(t.column("l_extendedprice").to_numpy()) \
            .astype(np.int64)
        keep = (x != mx) & (y != my)
        cell = 2 * (x[keep] > mx) + (y[keep] > my)
        cnt = np.bincount(cell, minlength=4).astype(np.int64)
        return pa.table({
            "cell": pa.array(np.arange(5, dtype=np.int64)),
            "n": pa.array(np.concatenate(
                [cnt, [np.int64(len(x) - int(keep.sum()))]]))})

    agg = (ds.map_batches(quadrants, batch_format="pyarrow")
           .to_pandas().groupby("cell", as_index=False)["n"].sum()
           .sort_values("cell"))
    c = agg["n"].to_numpy(np.int64)
    n_mm, n_mp, n_pm, n_pp = (int(c[0]), int(c[1]), int(c[2]),
                              int(c[3]))
    dropped = int(c[4])
    m = n_mm + n_mp + n_pm + n_pp
    num = n_pp + n_mm - n_pm - n_mp
    sgn = 1 if num >= 0 else -1
    beta_milli = sgn * (1000 * abs(num) // m) if m > 0 else 0
    return pd.DataFrame([(m + dropped, dropped, mx, my, n_pp, n_pm,
                          n_mp, n_mm, beta_milli)],
                        columns=["n_lines", "n_dropped", "med_qty",
                                 "med_price_dollars", "n_pp", "n_pm",
                                 "n_mp", "n_mm", "beta_milli"]) \
        .astype("int64")


def event_transition_drift(sf_dir: str) -> pd.DataFrame:
    """CONDITIONAL-DISTRIBUTION drift of the user Markov chain: per
    from_type, the total-variation distance between the next-type
    distributions of the two calendar halves (pair assigned to the
    half of its TO event's day; halves split at the integer midpoint
    of the observed span) — the transition-level refinement of the
    marginal drift gate: a chain can hold its type mix steady while
    rewiring where users go NEXT. Pair derivation is the shared
    (user, ts, event_id)-lexsort kernel of ``event_transitions``
    (analytics.py:2777); TV closes exactly as 10000 *
    sum_to |n1*T2 - n2*T1| // (2*T1*T2) with the one-sided-empty -1
    sentinel. One user%64 exchange; matrix-sized fold output."""
    ds = _read(sf_dir, "events",
               columns=["event_id", "user_id", "ts", "event_type"])

    def span(t: pa.Table) -> pa.Table:
        d = t.column("ts").cast(pa.int64()).to_numpy() \
            // 86_400_000_000
        return pa.table({"lo": pa.array([np.int64(d.min())]),
                         "hi": pa.array([np.int64(d.max())])})

    sp = ds.map_batches(span, batch_format="pyarrow").to_pandas()
    mid = (int(sp["lo"].min()) + int(sp["hi"].max())) // 2

    def derive(t: pa.Table) -> pa.Table:
        u = t.column("user_id").to_numpy().astype(np.int64)
        return pa.table({
            "user_id": pa.array(u),
            "ts_us": t.column("ts").cast(pa.int64()),
            "event_id": t.column("event_id"),
            "event_type": t.column("event_type"),
            "bucket": pa.array((u % 64).astype(np.int32))})

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        u = g["user_id"].to_numpy(np.int64)
        ts = g["ts_us"].to_numpy(np.int64)
        eid = g["event_id"].to_numpy(np.int64)
        order = np.lexsort((eid, ts, u))
        us = u[order]
        et = g["event_type"].to_numpy()[order]
        dy = ts[order] // 86_400_000_000
        same = np.empty(len(us), dtype=bool)
        if len(us):
            same[0] = False
            same[1:] = us[1:] == us[:-1]
        idx = np.flatnonzero(same)
        pairs = pd.DataFrame({
            "ft": et[idx - 1], "tt": et[idx],
            "h2": (dy[idx] > mid).astype(np.int64)})
        pairs["h1"] = 1 - pairs["h2"]
        return pairs.groupby(["ft", "tt"], as_index=False)[
            ["h1", "h2"]].sum()

    parts = (ds.map_batches(derive, batch_format="pyarrow")
             .groupby("bucket").map_groups(fold, batch_format="pandas")
             .to_pandas())
    c = parts.groupby(["ft", "tt"], as_index=False)[["h1", "h2"]].sum()
    rows = []
    for ft, g in c.groupby("ft"):
        t1 = int(g["h1"].sum())
        t2 = int(g["h2"].sum())
        if t1 == 0 or t2 == 0:
            rows.append((str(ft), t1, t2, -1))
            continue
        sv = sum(abs(int(r.h1) * t2 - int(r.h2) * t1)
                 for r in g.itertuples())
        rows.append((str(ft), t1, t2, 10_000 * sv // (2 * t1 * t2)))
    rows.sort()
    return pd.DataFrame(rows, columns=[
        "from_type", "n_h1", "n_h2", "tv_bps"]).astype(
        {c: "int64" for c in ("n_h1", "n_h2", "tv_bps")})


def lineitem_gamma_gk(sf_dir: str) -> pd.DataFrame:
    """GOODMAN-KRUSKAL GAMMA between the ordinal discount level
    (whole percents 0..10) and quantity (1..50) — the ordinal
    association measure that ignores ties entirely: concordant and
    discordant pair MASSES come from exact 2D suffix sums over the
    11 x 50 contingency grid (pair counts are O(N^2) numbers, never
    enumerated — grid algebra only), and gamma closes as the
    sign-normalized integer milli division sgn * (1000*|C-D| //
    (C+D)). Per-block 550-cell bincount partials — constant-size
    exchange, ZERO shuffle, NO float anywhere."""
    ds = _read(sf_dir, "lineitem", columns=["l_discount", "l_quantity"])

    def partial(t: pa.Table) -> pa.Table:
        a = np.floor(t.column("l_discount").to_numpy() * 100) \
            .astype(np.int64)
        b = np.floor(t.column("l_quantity").to_numpy()) \
            .astype(np.int64) - 1
        cell = a * 50 + b
        cnt = np.bincount(cell, minlength=550).astype(np.int64)
        return pa.table({
            "cell": pa.array(np.arange(550, dtype=np.int64)),
            "n": pa.array(cnt)})

    agg = (ds.map_batches(partial, batch_format="pyarrow")
           .to_pandas().groupby("cell", as_index=False)["n"].sum()
           .sort_values("cell"))
    grid = agg["n"].to_numpy(np.int64).reshape(11, 50)
    # suffix sums: S[a][b] = count of cells strictly greater in both
    gt = np.zeros((12, 51), dtype=object)
    for i in range(10, -1, -1):
        for j in range(49, -1, -1):
            gt[i][j] = (int(grid[i][j]) + gt[i + 1][j]
                        + gt[i][j + 1] - gt[i + 1][j + 1])
    conc = 0
    disc = 0
    for i in range(11):
        for j in range(50):
            nij = int(grid[i][j])
            if nij == 0:
                continue
            conc += nij * int(gt[i + 1][j + 1])
            lower = (gt[i + 1][0] - gt[i + 1][j]
                     if j > 0 else 0)
            disc += nij * int(lower)
    n = int(grid.sum())
    tot = conc + disc
    sgn = 1 if conc >= disc else -1
    gamma_milli = sgn * (1000 * abs(conc - disc) // tot) \
        if tot > 0 else 0
    return pd.DataFrame([(n, conc, disc, gamma_milli)],
                        columns=["n_lines", "concordant_pairs",
                                 "discordant_pairs", "gamma_milli"]) \
        .astype("int64")


def orders_wilcoxon_weekend(sf_dir: str) -> pd.DataFrame:
    """WILCOXON SIGNED-RANK test of the weekend revenue effect —
    each COMPLETE calendar week is one matched pair (mean weekend day
    vs mean weekday, compared exactly via the cross-multiplied 10x
    difference d = 5*(Sat+Sun) - 2*(Mon..Fri) in cents), zero-d weeks
    drop per the classic rule, |d| ranks as exact doubled midranks,
    W+ folds as a pure integer, and z closes as ONE IEEE-order-
    matched float ((W4 - n(n+1))/4) / sqrt(n(n+1)(2n+1)/24) * 1000
    floored (tie correction omitted, documented). Per-block daily
    partials — ZERO shuffle; ranking runs on the driver's week
    grid."""
    import math

    ds = _read(sf_dir, "orders", columns=["o_orderdate", "o_totalprice"])

    def partial(t: pa.Table) -> pa.Table:
        dy = t.column("o_orderdate").cast(pa.int64()).to_numpy() \
            // 86_400_000_000
        rev = np.floor(t.column("o_totalprice").to_numpy() * 100) \
            .astype(np.int64)
        u, inv = np.unique(dy, return_inverse=True)
        return pa.table({
            "dy": pa.array(u),
            "rev": pa.array(np.bincount(inv, weights=rev,
                                        minlength=len(u))
                            .astype(np.int64))})

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    agg = parts.groupby("dy", as_index=False)["rev"].sum()
    dy = agg["dy"].to_numpy(np.int64)
    rev = agg["rev"].to_numpy(np.int64)
    wk = (dy + 3) // 7
    dow = (dy + 3) % 7
    uw, wcnt = np.unique(wk, return_counts=True)
    complete = uw[wcnt == 7]
    keep = np.isin(wk, complete)
    wkk, dw, rv = wk[keep], dow[keep], rev[keep]
    wkend = np.isin(dw, (5, 6))
    d = []
    for w in complete:
        sel = wkk == w
        we = int(rv[sel & wkend].sum())
        wd = int(rv[sel & ~wkend].sum())
        d.append(5 * we - 2 * wd)
    d = np.array([x for x in d if x != 0], dtype=np.int64)
    n_zero = len(complete) - len(d)
    n = len(d)
    if n == 0:
        return pd.DataFrame([(0, n_zero, 0, 0)],
                            columns=["n_weeks_used", "n_zero_dropped",
                                     "w2_plus", "z_milli"]) \
            .astype("int64")
    ad = np.abs(d)
    order = np.argsort(ad, kind="mergesort")
    ads = ad[order]
    # doubled midranks over |d|
    w2p = 0
    for i in range(n):
        v = int(ad[i])
        rank_min = int((ads < v).sum()) + 1
        t_ties = int((ads == v).sum())
        if d[i] > 0:
            w2p += 2 * rank_min + t_ties - 1
    w4 = 2 * w2p
    e4 = n * (n + 1)
    z_milli = math.floor(
        (float(w4 - e4) / 4.0)
        / math.sqrt(float(n * (n + 1) * (2 * n + 1)) / 24.0)
        * 1000.0)
    return pd.DataFrame([(n, n_zero, w2p, z_milli)],
                        columns=["n_weeks_used", "n_zero_dropped",
                                 "w2_plus", "z_milli"]) \
        .astype("int64")


def orders_revenue_milestones(sf_dir: str) -> pd.DataFrame:
    """REVENUE MILESTONE CALENDAR — the first day the cumulative
    revenue curve crosses each decile of the final total (the
    time-to-X% planning table: is revenue front- or back-loaded?):
    per-block daily partials fold to the observed-day grid, the
    driver walks the exact integer cumsum once, and each milestone
    p=10..90 reports its ceil-threshold ceil(p*T/100) in cents, the
    first crossing day, and that day's exact cumulative share in bps.
    Pure integers end to end — NO float; ZERO shuffle."""
    ds = _read(sf_dir, "orders", columns=["o_orderdate", "o_totalprice"])

    def partial(t: pa.Table) -> pa.Table:
        dy = t.column("o_orderdate").cast(pa.int64()).to_numpy() \
            // 86_400_000_000
        rev = np.floor(t.column("o_totalprice").to_numpy() * 100) \
            .astype(np.int64)
        u, inv = np.unique(dy, return_inverse=True)
        return pa.table({
            "dy": pa.array(u),
            "rev": pa.array(np.bincount(inv, weights=rev,
                                        minlength=len(u))
                            .astype(np.int64))})

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    agg = (parts.groupby("dy", as_index=False)["rev"].sum()
           .sort_values("dy", kind="mergesort"))
    dy = agg["dy"].to_numpy(np.int64)
    cum = agg["rev"].to_numpy(np.int64).cumsum()
    total = int(cum[-1])
    d0 = int(dy[0])
    rows = []
    for p in range(10, 100, 10):
        thr = -(-p * total // 100)
        i = int(np.searchsorted(cum, thr))
        rows.append((p, thr, int(dy[i]), int(dy[i]) - d0,
                     10_000 * int(cum[i]) // total))
    return pd.DataFrame(rows, columns=[
        "pct", "threshold_cents", "cross_dy", "days_from_start",
        "cum_share_bps"]).astype("int64")


def lineitem_position_profile(sf_dir: str) -> pd.DataFrame:
    """LINE-POSITION effects — does the Nth line of an order behave
    differently from the 1st (basket-composition bias that breaks
    naive per-line samplers): per l_linenumber, line count, exact
    mean quantity in milli units, mean discount in bps, revenue
    share of the whole table in bps, and the quantity lift vs the
    global mean as a cross-multiplied integer sign-normalized bps
    ratio. Constant per-position per-block partials (the position
    domain is 1..7) — pure integers, NO float, ZERO shuffle."""
    ds = _read(sf_dir, "lineitem",
               columns=["l_linenumber", "l_quantity", "l_discount",
                        "l_extendedprice"])

    def partial(t: pa.Table) -> pa.Table:
        ln = t.column("l_linenumber").to_numpy().astype(np.int64)
        q = np.floor(t.column("l_quantity").to_numpy()) \
            .astype(np.int64)
        disc = np.floor(t.column("l_discount").to_numpy() * 10000) \
            .astype(np.int64)
        rev = np.floor(t.column("l_extendedprice").to_numpy() * 100) \
            .astype(np.int64)
        mx = int(ln.max()) + 1
        return pa.table({
            "ln": pa.array(np.arange(1, mx, dtype=np.int64)),
            "n": pa.array(np.bincount(ln, minlength=mx)[1:]
                          .astype(np.int64)),
            "sq": pa.array(np.bincount(ln, weights=q, minlength=mx)
                           [1:].astype(np.int64)),
            "sd": pa.array(np.bincount(ln, weights=disc,
                                       minlength=mx)[1:]
                           .astype(np.int64)),
            "sr": pa.array(np.bincount(ln, weights=rev, minlength=mx)
                           [1:].astype(np.int64))})

    agg = (ds.map_batches(partial, batch_format="pyarrow")
           .to_pandas().groupby("ln", as_index=False).sum()
           .sort_values("ln"))
    agg = agg[agg["n"] > 0]
    n_tot = int(agg["n"].sum())
    sq_tot = int(agg["sq"].sum())
    sr_tot = int(agg["sr"].sum())
    rows = []
    for r in agg.itertuples():
        n_i, sq_i = int(r.n), int(r.sq)
        num = sq_i * n_tot - sq_tot * n_i
        sgn = 1 if num >= 0 else -1
        lift = sgn * (10_000 * abs(num) // (sq_tot * n_i))
        rows.append((int(r.ln), n_i, 1000 * sq_i // n_i,
                     int(r.sd) // n_i,
                     10_000 * int(r.sr) // sr_tot, lift))
    return pd.DataFrame(rows, columns=[
        "l_linenumber", "n_lines", "mean_qty_milli",
        "mean_disc_bps", "rev_share_bps", "qty_lift_bps"]) \
        .astype("int64")


def lineitem_dose_response(sf_dir: str) -> pd.DataFrame:
    """DOSE-RESPONSE MONOTONICITY audit of the discount ladder — does
    mean quantity actually climb with every extra percent of
    discount, or does the curve kink: per whole-percent discount
    level, line count and exact milli mean quantity, and a
    violation marker against the NEXT present level decided by the
    cross-multiplied integer compare sq_next*n_cur < sq_cur*n_next
    (strict decrease = violation 1, non-decrease 0, last level -1) —
    the isotonic-regression pre-check in pure integers, NO float.
    Constant 11-cell per-block partials — ZERO shuffle."""
    ds = _read(sf_dir, "lineitem", columns=["l_discount", "l_quantity"])

    def partial(t: pa.Table) -> pa.Table:
        a = np.floor(t.column("l_discount").to_numpy() * 100) \
            .astype(np.int64)
        q = np.floor(t.column("l_quantity").to_numpy()) \
            .astype(np.int64)
        return pa.table({
            "lvl": pa.array(np.arange(11, dtype=np.int64)),
            "n": pa.array(np.bincount(a, minlength=11)
                          .astype(np.int64)),
            "sq": pa.array(np.bincount(a, weights=q, minlength=11)
                           .astype(np.int64))})

    agg = (ds.map_batches(partial, batch_format="pyarrow")
           .to_pandas().groupby("lvl", as_index=False).sum()
           .sort_values("lvl"))
    agg = agg[agg["n"] > 0].reset_index(drop=True)
    rows = []
    for i in range(len(agg)):
        lvl = int(agg.loc[i, "lvl"])
        n_i = int(agg.loc[i, "n"])
        sq_i = int(agg.loc[i, "sq"])
        if i + 1 < len(agg):
            n_j = int(agg.loc[i + 1, "n"])
            sq_j = int(agg.loc[i + 1, "sq"])
            viol = 1 if sq_j * n_i < sq_i * n_j else 0
        else:
            viol = -1
        rows.append((lvl, n_i, 1000 * sq_i // n_i, viol))
    return pd.DataFrame(rows, columns=[
        "discount_pct", "n_lines", "mean_qty_milli", "viol_next"]) \
        .astype("int64")


def events_daily_record_census(sf_dir: str) -> pd.DataFrame:
    """RECORD-BREAKING census of the daily maximum event value — how
    often does the stream set a new all-time single-event high (the
    extreme-value process a capacity planner watches; under i.i.d.
    days the record count grows like ln n): daily max cents fold as
    per-block partials (a max-mergeable grid), the driver walks the
    day-ordered running max once, and the output is pure integers —
    record days are STRICT increases of the running max (day one is
    record #1), the longest drought is the max calendar-day gap
    between consecutive record days, and the final record value
    reports in exact cents. ZERO shuffle, NO float."""
    ds = _read(sf_dir, "events", columns=["ts", "value"])

    def partial(t: pa.Table) -> pa.Table:
        dy = t.column("ts").cast(pa.int64()).to_numpy() \
            // 86_400_000_000
        cents = np.floor(t.column("value").to_numpy() * 100) \
            .astype(np.int64)
        df = pd.DataFrame({"dy": dy, "v": cents})
        g = df.groupby("dy", as_index=False)["v"].max()
        return pa.table({"dy": pa.array(g["dy"].to_numpy(np.int64)),
                         "v": pa.array(g["v"].to_numpy(np.int64))})

    parts = (ds.map_batches(partial, batch_format="pyarrow")
             .to_pandas().groupby("dy", as_index=False)["v"].max()
             .sort_values("dy", kind="mergesort"))
    dy = parts["dy"].to_numpy(np.int64)
    v = parts["v"].to_numpy(np.int64)
    run = np.maximum.accumulate(v)
    rec = np.empty(len(v), dtype=bool)
    rec[0] = True
    rec[1:] = v[1:] > run[:-1]
    rdays = dy[rec]
    gaps = np.diff(rdays)
    longest = int(gaps.max()) if len(gaps) else 0
    return pd.DataFrame([(len(dy), int(rec.sum()), int(rdays[0]),
                          int(rdays[-1]), longest, int(run[-1]))],
                        columns=["n_days", "n_records",
                                 "first_record_dy", "last_record_dy",
                                 "longest_drought_days",
                                 "final_record_cents"]) \
        .astype("int64")


def customer_cvm_segments(sf_dir: str) -> pd.DataFrame:
    """CRAMER-VON MISES-style INTEGRATED ECDF distance between the
    BUILDING and AUTOMOBILE segments' account-balance distributions —
    the whole-curve companion to the sup-gap KS test: over the pooled
    value-level grid (one bounded-cents count fold), psi = sum_v
    c_v * (m*A_v - n*B_v)^2 accumulates the squared cross-multiplied
    ECDF gap at every pooled observation EXACTLY (A/B are cumulative
    counts, so no rational ever appears), and the normalized score
    closes as one integer division cvm_milli = 1000 * psi //
    ((n+m) * n * n * m * m) — pure integers end to end, Python
    bigints on the driver, HUGEINT in the twin. ZERO row shuffle."""
    ds = _read(sf_dir, "customer", columns=["c_mktsegment", "c_acctbal"])
    segs = ("BUILDING", "AUTOMOBILE")

    def partial(t: pa.Table) -> pa.Table:
        seg = np.asarray(t.column("c_mktsegment")).astype(object)
        v = np.floor(t.column("c_acctbal").to_numpy() * 100) \
            .astype(np.int64)
        keep = (seg == segs[0]) | (seg == segs[1])
        sv = v[keep]
        sa = (seg[keep] == segs[0]).astype(np.int64)
        df = pd.DataFrame({"v": sv, "a": sa, "b": 1 - sa})
        g = df.groupby("v", as_index=False)[["a", "b"]].sum()
        return pa.table({"v": pa.array(g["v"].to_numpy(np.int64)),
                         "a": pa.array(g["a"].to_numpy(np.int64)),
                         "b": pa.array(g["b"].to_numpy(np.int64))})

    g = (ds.map_batches(partial, batch_format="pyarrow")
         .to_pandas().groupby("v", as_index=False)[["a", "b"]].sum()
         .sort_values("v", kind="mergesort"))
    ca = g["a"].to_numpy(np.int64).cumsum()
    cb = g["b"].to_numpy(np.int64).cumsum()
    cv = (g["a"] + g["b"]).to_numpy(np.int64)
    n = int(ca[-1])
    m = int(cb[-1])
    psi = sum(int(c) * (m * int(av) - n * int(bv)) ** 2
              for c, av, bv in zip(cv, ca, cb))
    cvm_milli = (1000 * psi // ((n + m) * n * n * m * m)
                 if n > 0 and m > 0 else 0)
    return pd.DataFrame([(n, m, psi, cvm_milli)],
                        columns=["n_building", "n_automobile",
                                 "psi", "cvm_milli"]).astype("int64")


def events_ljung_box(sf_dir: str, max_lag: int = 7) -> pd.DataFrame:
    """LJUNG-BOX portmanteau test on the daily event-VOLUME series —
    is the stream's day-to-day count white noise, judged JOINTLY over
    lags 1..7 (the one-number gate on top of the per-lag ACF): each
    lag's squared autocorrelation enters as the EXACT integer term
    floor(1000*n*(n+2)*num_k^2 / ((n-k)*d1_k*d2_k)) built from the
    gapfilled-grid pair moments (num = cross-covariance numerator,
    d1/d2 the two leg variances — counts are small enough that every
    product stays inside HUGEINT), and Q_milli is the plain integer
    sum of the per-lag floors — documented per-term flooring, NO
    float on either side. Day-cardinality rollup via one small
    aggregate; the lag sweep runs on the calendar vector."""
    ds = _read(sf_dir, "events", columns=["ts"])

    def partial(t: pa.Table) -> pa.Table:
        dy = t.column("ts").cast(pa.int64()).to_numpy() \
            // 86_400_000_000
        u, cnt = np.unique(dy, return_counts=True)
        return pa.table({"dy": pa.array(u),
                         "c": pa.array(cnt.astype(np.int64))})

    parts = (ds.map_batches(partial, batch_format="pyarrow")
             .to_pandas().groupby("dy", as_index=False)["c"].sum()
             .sort_values("dy"))
    days = parts["dy"].to_numpy(np.int64)
    lo, hi = int(days.min()), int(days.max())
    tvec = np.zeros(hi - lo + 1, dtype=np.int64)
    tvec[days - lo] = parts["c"].to_numpy(np.int64)
    n = len(tvec)
    q_milli = 0
    for k in range(1, max_lag + 1):
        x = tvec[:-k]
        y = tvec[k:]
        nk = len(x)
        sx, sy = int(x.sum()), int(y.sum())
        sxy = int((x * y).sum())
        sxx = int((x * x).sum())
        syy = int((y * y).sum())
        num = nk * sxy - sx * sy
        d1 = nk * sxx - sx * sx
        d2 = nk * syy - sy * sy
        if d1 > 0 and d2 > 0:
            term = (1000 * n * (n + 2) * num * num
                    // ((n - k) * d1 * d2))
        else:
            term = 0
        q_milli += term
    return pd.DataFrame([(n, max_lag, q_milli)],
                        columns=["n_days", "max_lag", "q_milli"]) \
        .astype("int64")


def events_brown_forsythe(sf_dir: str) -> pd.DataFrame:
    """BROWN-FORSYTHE variance-homogeneity test across event types —
    the precondition gate the t/ANOVA family silently assumes: are
    value spreads equal? Phase 1 folds per-type value-level counts
    over the bounded cents domain and takes exact ceil-rank medians;
    phase 2 re-streams the table and runs the INTEGER one-way ANOVA
    (the ``orders_dow_anova`` discipline) on the absolute deviations
    z = |cents - med_type|: group z-means floored to milli keep
    SSB/SSW exact (Python bigints / HUGEINT), and F closes fully in
    integer arithmetic — NO float on either side. The inherent
    two-phase split mirrors the twin's quantile_disc."""
    ds = _read(sf_dir, "events", columns=["event_type", "value"])

    def hist(t: pa.Table) -> pa.Table:
        et = np.asarray(t.column("event_type")).astype(object)
        v = np.floor(t.column("value").to_numpy() * 100) \
            .astype(np.int64)
        df = pd.DataFrame({"et": et, "v": v})
        g = df.groupby(["et", "v"], as_index=False).size()
        return pa.table({"et": pa.array(g["et"], type=pa.string()),
                         "v": pa.array(g["v"].to_numpy(np.int64)),
                         "c": pa.array(g["size"].to_numpy(np.int64))})

    h = (ds.map_batches(hist, batch_format="pyarrow")
         .to_pandas().groupby(["et", "v"], as_index=False)["c"].sum())
    meds = {}
    for et, g in h.groupby("et"):
        g = g.sort_values("v", kind="mergesort")
        cum = g["c"].to_numpy(np.int64).cumsum()
        n = int(cum[-1])
        meds[str(et)] = int(g["v"].to_numpy(np.int64)[
            np.searchsorted(cum, -(-n // 2))])

    def moments(t: pa.Table) -> pa.Table:
        et = np.asarray(t.column("event_type")).astype(object)
        v = np.floor(t.column("value").to_numpy() * 100) \
            .astype(np.int64)
        med = np.array([meds[x] for x in et], dtype=np.int64)
        z = np.abs(v - med)
        df = pd.DataFrame({"et": et, "n": 1, "s": z, "q": z * z})
        g = df.groupby("et", as_index=False).sum()
        return pa.Table.from_pandas(g, preserve_index=False)

    agg = (ds.map_batches(moments, batch_format="pyarrow")
           .to_pandas().groupby("et", as_index=False).sum()
           .sort_values("et"))
    n = int(agg["n"].sum())
    k = len(agg)
    s_tot = sum(int(x) for x in agg["s"])
    mbar = 1000 * s_tot // n
    ssb = ssw = 0
    best = worst = None
    for r in agg.itertuples():
        n_i, s_i, q_i = int(r.n), int(r.s), int(r.q)
        m_i = 1000 * s_i // n_i
        ssb += n_i * (m_i - mbar) * (m_i - mbar)
        ssw += 1_000_000 * q_i - 2 * m_i * 1000 * s_i + n_i * m_i * m_i
        if best is None or m_i > best[1]:
            best = (str(r.et), m_i)
        if worst is None or m_i < worst[1]:
            worst = (str(r.et), m_i)
    f_milli = (1000 * ssb * (n - k) // (ssw * (k - 1))
               if ssw > 0 and k > 1 else 0)
    eta2_bps = 10_000 * ssb // (ssb + ssw) if ssb + ssw > 0 else 0
    return pd.DataFrame([(n, k, f_milli, eta2_bps, best[0],
                          worst[0])],
                        columns=["n_events", "n_types", "f_milli",
                                 "eta2_bps", "widest_type",
                                 "tightest_type"]).astype(
        {c: "int64" for c in ("n_events", "n_types", "f_milli",
                              "eta2_bps")})


def lineitem_tail_dependence(sf_dir: str) -> pd.DataFrame:
    """JOINT TAIL DEPENDENCE between quantity and discount — do the
    extremes co-occur (the copula question marginal correlations
    can't answer): phase 1 folds both bounded value-level histograms
    in one pass and takes exact ceil-rank upper/lower quartiles;
    phase 2 re-streams counting the four joint-tail cells (strict
    beyond-quartile on BOTH axes), and each tail's dependence lift
    closes as the exact integer 10000 * n_joint * N // (n_x * n_y)
    (independence = 10000 bps). Pure integers, constant per-block
    partials, ZERO shuffle; the two-phase split mirrors the twin's
    quantile_disc."""
    ds = _read(sf_dir, "lineitem", columns=["l_quantity", "l_discount"])

    def hists(t: pa.Table) -> pa.Table:
        x = np.floor(t.column("l_quantity").to_numpy()) \
            .astype(np.int64)
        y = np.floor(t.column("l_discount").to_numpy() * 100) \
            .astype(np.int64)
        ux, cx = np.unique(x, return_counts=True)
        uy, cy = np.unique(y, return_counts=True)
        return pa.table({
            "kind": pa.array(np.concatenate(
                [np.zeros(len(ux), dtype=np.int64),
                 np.ones(len(uy), dtype=np.int64)])),
            "v": pa.array(np.concatenate([ux, uy])),
            "c": pa.array(np.concatenate([cx, cy]).astype(np.int64))})

    h = (ds.map_batches(hists, batch_format="pyarrow")
         .to_pandas().groupby(["kind", "v"], as_index=False)["c"]
         .sum())

    def quart(kind: int, num: int, den: int) -> int:
        g = h[h["kind"] == kind].sort_values("v", kind="mergesort")
        cum = g["c"].to_numpy(np.int64).cumsum()
        n = int(cum[-1])
        return int(g["v"].to_numpy(np.int64)[
            np.searchsorted(cum, -(-num * n // den))])

    qx_hi, qx_lo = quart(0, 3, 4), quart(0, 1, 4)
    qy_hi, qy_lo = quart(1, 3, 4), quart(1, 1, 4)

    def tails(t: pa.Table) -> pa.Table:
        x = np.floor(t.column("l_quantity").to_numpy()) \
            .astype(np.int64)
        y = np.floor(t.column("l_discount").to_numpy() * 100) \
            .astype(np.int64)
        return pa.table({k: pa.array([np.int64(v)]) for k, v in (
            ("n", len(x)),
            ("nx_hi", (x > qx_hi).sum()),
            ("ny_hi", (y > qy_hi).sum()),
            ("nj_hi", ((x > qx_hi) & (y > qy_hi)).sum()),
            ("nx_lo", (x < qx_lo).sum()),
            ("ny_lo", (y < qy_lo).sum()),
            ("nj_lo", ((x < qx_lo) & (y < qy_lo)).sum()))})

    p = ds.map_batches(tails, batch_format="pyarrow").to_pandas()
    n = int(p["n"].sum())
    nx_hi, ny_hi, nj_hi, nx_lo, ny_lo, nj_lo = (
        int(p[c].sum()) for c in ("nx_hi", "ny_hi", "nj_hi",
                                  "nx_lo", "ny_lo", "nj_lo"))
    lift_hi = (10_000 * nj_hi * n // (nx_hi * ny_hi)
               if nx_hi and ny_hi else -1)
    lift_lo = (10_000 * nj_lo * n // (nx_lo * ny_lo)
               if nx_lo and ny_lo else -1)
    return pd.DataFrame([(n, qx_hi, qy_hi, nx_hi, ny_hi, nj_hi,
                          lift_hi, qx_lo, qy_lo, nx_lo, ny_lo,
                          nj_lo, lift_lo)],
                        columns=["n_lines", "qx_hi", "qy_hi",
                                 "nx_hi", "ny_hi", "n_joint_hi",
                                 "lift_hi_bps", "qx_lo", "qy_lo",
                                 "nx_lo", "ny_lo", "n_joint_lo",
                                 "lift_lo_bps"]).astype("int64")


_HOUR_COS = np.array([
    1000000, 965925, 866025, 707106, 500000, 258819, 0, -258820,
    -500000, -707107, -866026, -965926, -1000000, -965926, -866026,
    -707107, -500001, -258820, -1, 258819, 500000, 707106, 866025,
    965925], dtype=np.int64)
_HOUR_SIN = np.array([
    0, 258819, 499999, 707106, 866025, 965925, 1000000, 965925,
    866025, 707106, 499999, 258819, 0, -258820, -500000, -707107,
    -866026, -965926, -1000000, -965926, -866026, -707107, -500001,
    -258820], dtype=np.int64)


def events_rayleigh_hour(sf_dir: str) -> pd.DataFrame:
    """RAYLEIGH circular-uniformity test of the hour-of-day load —
    trig-free circular statistics: each of the 24 hours maps to a
    FIXED integer lattice vector (floor(1e6*cos/sin), literal
    constants shared verbatim with the twin, so no libm call ever
    runs on either side), the resultant components Sx/Sy fold as
    exact integers from per-block 24-cell hour bincounts, and the
    Rayleigh statistic closes as the pure integer z_milli =
    1000*(Sx^2+Sy^2) // (n*10^12) plus the peak-pull direction as
    the argmax lattice hour of the dot product (tie -> smallest
    hour). Python bigints / HUGEINT; ZERO shuffle, NO float."""
    ds = _read(sf_dir, "events", columns=["ts"])

    def partial(t: pa.Table) -> pa.Table:
        hr = (t.column("ts").cast(pa.int64()).to_numpy()
              // 3_600_000_000) % 24
        cnt = np.bincount(hr, minlength=24).astype(np.int64)
        return pa.table({"hr": pa.array(np.arange(24, dtype=np.int64)),
                         "n": pa.array(cnt)})

    agg = (ds.map_batches(partial, batch_format="pyarrow")
           .to_pandas().groupby("hr", as_index=False)["n"].sum()
           .sort_values("hr"))
    c = agg["n"].to_numpy(np.int64)
    n = int(c.sum())
    sx = sum(int(a) * int(b) for a, b in zip(c, _HOUR_COS))
    sy = sum(int(a) * int(b) for a, b in zip(c, _HOUR_SIN))
    r2 = sx * sx + sy * sy
    z_milli = 1000 * r2 // (n * 10 ** 12)
    dots = [(int(_HOUR_COS[h]) * sx + int(_HOUR_SIN[h]) * sy, -h)
            for h in range(24)]
    peak_hour = -max(dots)[1]
    return pd.DataFrame([(n, sx, sy, z_milli, peak_hour)],
                        columns=["n_events", "sx_fp", "sy_fp",
                                 "z_milli", "peak_hour"]) \
        .astype("int64")


def events_hour_resultant_by_type(sf_dir: str) -> pd.DataFrame:
    """PER-TYPE circular concentration of the diurnal cycle — the
    mean-resultant-length R-bar of each event type's hour-of-day
    distribution on the same integer trig lattice as the Rayleigh
    gate (methodologically circular, unlike top-k hour shares: a
    type spread evenly across two opposite hours scores ZERO):
    Sx/Sy exact integer folds from (type, hour) bincount partials,
    rbar_bps = floor(sqrt(Sx^2+Sy^2)/(n*1e6)*10000) as the ONE
    IEEE-order-matched float per type, circular variance
    10000 - rbar_bps. Types x 24 grid — ZERO shuffle."""
    import math

    ds = _read(sf_dir, "events", columns=["event_type", "ts"])

    def partial(t: pa.Table) -> pa.Table:
        et = np.asarray(t.column("event_type")).astype(object)
        hr = (t.column("ts").cast(pa.int64()).to_numpy()
              // 3_600_000_000) % 24
        code, uniq = pd.factorize(et)
        pack = code.astype(np.int64) * 24 + hr
        u, cnt = np.unique(pack, return_counts=True)
        return pa.table({
            "et": pa.array(np.asarray(uniq, dtype=object)[u // 24],
                           type=pa.string()),
            "hr": pa.array((u % 24).astype(np.int64)),
            "n": pa.array(cnt.astype(np.int64))})

    agg = (ds.map_batches(partial, batch_format="pyarrow")
           .to_pandas().groupby(["et", "hr"], as_index=False)["n"]
           .sum())
    rows = []
    for et, g in agg.groupby("et"):
        cnt = np.zeros(24, dtype=np.int64)
        cnt[g["hr"].to_numpy(np.int64)] = g["n"].to_numpy(np.int64)
        n = int(cnt.sum())
        sx = sum(int(a) * int(b) for a, b in zip(cnt, _HOUR_COS))
        sy = sum(int(a) * int(b) for a, b in zip(cnt, _HOUR_SIN))
        rbar_bps = math.floor(
            math.sqrt(float(sx * sx + sy * sy))
            / (float(n) * 1e6) * 10000.0)
        rows.append((str(et), n, rbar_bps, 10_000 - rbar_bps))
    rows.sort()
    return pd.DataFrame(rows, columns=[
        "event_type", "n_events", "rbar_bps", "circ_var_bps"]) \
        .astype({c: "int64" for c in ("n_events", "rbar_bps",
                                      "circ_var_bps")})


def hash_partition_balance(sf_dir: str) -> pd.DataFrame:
    """HASH-PARTITION BALANCE planner — before trusting an
    orderkey-hash shuffle at 100 TB, measure how evenly md5 actually
    spreads THIS key population at the partition counts a cluster
    would use (16 / 64 / 256): per width, the min/max partition
    loads, the max-over-average imbalance in bps, and a uniformity
    chi-square accumulated as exact per-cell integer milli floors
    1000*(k*c - N)^2 // (k*N) (order-free sum). One md5 per row
    shared across all three widths via nested moduli; constant
    336-cell per-block partials — ZERO shuffle, NO float."""
    from ..functions.hashing import hash64_many

    ds = _read(sf_dir, "lineitem", columns=["l_orderkey"])
    widths = (16, 64, 256)

    def partial(t: pa.Table) -> pa.Table:
        ok = t.column("l_orderkey").to_numpy().astype(np.int64)
        h = hash64_many([str(x) for x in ok])
        ws, ps, ns = [], [], []
        for w in widths:
            b = (h % np.uint64(w)).astype(np.int64)
            cnt = np.bincount(b, minlength=w).astype(np.int64)
            ws.append(np.full(w, w, dtype=np.int64))
            ps.append(np.arange(w, dtype=np.int64))
            ns.append(cnt)
        return pa.table({"w": pa.array(np.concatenate(ws)),
                         "p": pa.array(np.concatenate(ps)),
                         "n": pa.array(np.concatenate(ns))})

    agg = (ds.map_batches(partial, batch_format="pyarrow")
           .to_pandas().groupby(["w", "p"], as_index=False)["n"]
           .sum())
    rows = []
    for w in widths:
        g = agg[agg["w"] == w].sort_values("p")
        c = g["n"].to_numpy(np.int64)
        n = int(c.sum())
        mx, mn = int(c.max()), int(c.min())
        imb_bps = 10_000 * (mx * w - n) // n
        chi2m = sum(1000 * (w * int(x) - n) ** 2 // (w * n)
                    for x in c)
        rows.append((w, n, mn, mx, imb_bps, chi2m))
    return pd.DataFrame(rows, columns=[
        "n_partitions", "n_rows", "min_load", "max_load",
        "imbalance_bps", "chi2_milli"]).astype("int64")


def events_inspection_paradox(sf_dir: str) -> pd.DataFrame:
    """INSPECTION PARADOX audit of user inter-event gaps — the mean
    gap a RANDOM PROBE lands in is the length-biased E[g^2]/E[g],
    not E[g]; their ratio is exactly 1 + CV^2 and tells an on-call
    engineer how much worse a sampled wait looks than the average
    wait. Gaps come from the shared (user, ts, event_id)-lexsort
    consecutive-pair kernel in whole seconds; the three moments fold
    as per-block exact integers (squares ride Python bigints /
    HUGEINT), and every output closes in pure integer division:
    mean_gap_milli, biased_mean_milli = 1000*Sg2//Sg, and
    paradox_ratio_bps = 10000*Sg2*n // Sg^2. ZERO shuffle beyond
    the one user-bucket exchange; NO float."""
    ds = _read(sf_dir, "events", columns=["event_id", "user_id", "ts"])

    def derive(t: pa.Table) -> pa.Table:
        u = t.column("user_id").to_numpy().astype(np.int64)
        return pa.table({
            "user_id": pa.array(u),
            "ts_us": t.column("ts").cast(pa.int64()),
            "event_id": t.column("event_id"),
            "bucket": pa.array((u % 64).astype(np.int32))})

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        u = g["user_id"].to_numpy(np.int64)
        ts = g["ts_us"].to_numpy(np.int64)
        eid = g["event_id"].to_numpy(np.int64)
        order = np.lexsort((eid, ts, u))
        us = u[order]
        tss = ts[order]
        same = np.empty(len(us), dtype=bool)
        if len(us):
            same[0] = False
            same[1:] = us[1:] == us[:-1]
        idx = np.flatnonzero(same)
        gap = (tss[idx] - tss[idx - 1]) // 1_000_000
        return pd.DataFrame({
            "n": [len(gap)],
            "sg": [int(gap.sum())],
            "sg2": [sum(int(x) * int(x) for x in gap)]})

    p = (ds.map_batches(derive, batch_format="pyarrow")
         .groupby("bucket").map_groups(fold, batch_format="pandas")
         .to_pandas())
    n = int(p["n"].sum())
    sg = sum(int(x) for x in p["sg"])
    sg2 = sum(int(x) for x in p["sg2"])
    if n == 0 or sg == 0:
        return pd.DataFrame([(n, sg, 0, 0, 0)],
                            columns=["n_gaps", "sum_gap_s",
                                     "mean_gap_milli",
                                     "biased_mean_milli",
                                     "paradox_ratio_bps"]) \
            .astype("int64")
    return pd.DataFrame([(n, sg, 1000 * sg // n, 1000 * sg2 // sg,
                          10_000 * sg2 * n // (sg * sg))],
                        columns=["n_gaps", "sum_gap_s",
                                 "mean_gap_milli",
                                 "biased_mean_milli",
                                 "paradox_ratio_bps"]) \
        .astype("int64")


def orders_var_es(sf_dir: str) -> pd.DataFrame:
    """HISTORICAL VaR and EXPECTED SHORTFALL of the day-over-day
    revenue change — the risk-desk tail pair aimed at pipeline
    throughput: deltas between consecutive OBSERVED days, the p1/p5
    Value-at-Risk as exact ceil-rank order statistics (the
    quantile_disc rule), and each tail's Expected Shortfall as the
    sign-normalized integer mean sgn*(|sum|//count) over deltas at
    or below the VaR (so numpy-floor vs DuckDB-truncate on negative
    means never bites). Per-block daily partials — ZERO shuffle, NO
    float."""
    ds = _read(sf_dir, "orders", columns=["o_orderdate", "o_totalprice"])

    def partial(t: pa.Table) -> pa.Table:
        dy = t.column("o_orderdate").cast(pa.int64()).to_numpy() \
            // 86_400_000_000
        rev = np.floor(t.column("o_totalprice").to_numpy() * 100) \
            .astype(np.int64)
        u, inv = np.unique(dy, return_inverse=True)
        return pa.table({
            "dy": pa.array(u),
            "rev": pa.array(np.bincount(inv, weights=rev,
                                        minlength=len(u))
                            .astype(np.int64))})

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    agg = (parts.groupby("dy", as_index=False)["rev"].sum()
           .sort_values("dy", kind="mergesort"))
    r = agg["rev"].to_numpy(np.int64)
    delta = r[1:] - r[:-1]
    n = len(delta)
    srt = np.sort(delta)
    rows = []
    for pct, qn, qd in ((1, 1, 100), (5, 1, 20)):
        rank = -(-qn * n // qd)
        var_c = int(srt[rank - 1])
        tail = delta[delta <= var_c]
        ssum = sum(int(x) for x in tail)
        cnt = len(tail)
        sgn = 1 if ssum >= 0 else -1
        es_c = sgn * (abs(ssum) // cnt) if cnt else 0
        rows.append((pct, n, var_c, cnt, es_c))
    return pd.DataFrame(rows, columns=[
        "pct", "n_deltas", "var_cents", "n_tail", "es_cents"]) \
        .astype("int64")


def nation_revenue_shift_share(sf_dir: str) -> pd.DataFrame:
    """SHIFT-SHARE decomposition of each customer nation's revenue
    growth between the two calendar halves — the economist's question
    for a sales ledger: how much of a nation's change is the global
    tide (national effect), how much is its PRIORITY MIX riding
    faster-growing order classes (mix effect), and what residual is
    genuinely competitive. Orders route to nations through a
    broadcast custkey->nation LUT (``ray.put`` once); per-block
    (nation, priority, half) cent partials fold on the driver, and
    every effect closes in exact integer cents with documented
    floors: nat = R1_i*T2//T1 - R1_i, mix = sum_p(R1_ip*T2_p//T1_p)
    - R1_i*T2//T1 (empty-H1 priorities contribute 0), residual =
    delta - nat - mix so the decomposition reconstructs EXACTLY.
    Python bigints / HUGEINT; NO float."""
    import ray

    cust = _read(sf_dir, "customer",
                 columns=["c_custkey", "c_nationkey"]).to_pandas()
    ck = cust["c_custkey"].to_numpy(np.int64)
    c_nat = np.zeros(ck.max() + 1, dtype=np.int64)
    c_nat[ck] = cust["c_nationkey"].to_numpy(np.int64)
    ref = ray.put(c_nat)

    ds = _read(sf_dir, "orders",
               columns=["o_custkey", "o_orderdate", "o_totalprice",
                        "o_orderpriority"])

    def span(t: pa.Table) -> pa.Table:
        d = t.column("o_orderdate").cast(pa.int64()).to_numpy() \
            // 86_400_000_000
        return pa.table({"lo": pa.array([np.int64(d.min())]),
                         "hi": pa.array([np.int64(d.max())])})

    sp = ds.map_batches(span, batch_format="pyarrow").to_pandas()
    mid = (int(sp["lo"].min()) + int(sp["hi"].max())) // 2

    def partial(t: pa.Table) -> pa.Table:
        import ray as _ray
        lut = _ray.get(ref)
        dy = t.column("o_orderdate").cast(pa.int64()).to_numpy() \
            // 86_400_000_000
        nk = lut[t.column("o_custkey").to_numpy().astype(np.int64)]
        pri = np.asarray(t.column("o_orderpriority")).astype(object)
        cents = np.floor(t.column("o_totalprice").to_numpy() * 100) \
            .astype(np.int64)
        df = pd.DataFrame({"nk": nk, "pri": pri,
                           "h": (dy > mid).astype(np.int64),
                           "c": cents})
        g = df.groupby(["nk", "pri", "h"], as_index=False)["c"].sum()
        return pa.table({"nk": pa.array(g["nk"].to_numpy(np.int64)),
                         "pri": pa.array(g["pri"], type=pa.string()),
                         "h": pa.array(g["h"].to_numpy(np.int64)),
                         "c": pa.array(g["c"].to_numpy(np.int64))})

    agg = (ds.map_batches(partial, batch_format="pyarrow")
           .to_pandas().groupby(["nk", "pri", "h"], as_index=False)
           ["c"].sum())
    t1 = int(agg.loc[agg["h"] == 0, "c"].sum())
    t2 = int(agg.loc[agg["h"] == 1, "c"].sum())
    tp = {}
    for pri, g in agg.groupby("pri"):
        tp[str(pri)] = (int(g.loc[g["h"] == 0, "c"].sum()),
                        int(g.loc[g["h"] == 1, "c"].sum()))
    rows = []
    for nk in sorted(agg["nk"].unique()):
        g = agg[agg["nk"] == nk]
        r1 = int(g.loc[g["h"] == 0, "c"].sum())
        r2 = int(g.loc[g["h"] == 1, "c"].sum())
        nat = r1 * t2 // t1 - r1 if t1 else 0
        mix_base = 0
        for pri, gg in g[g["h"] == 0].groupby("pri"):
            r1p = int(gg["c"].sum())
            t1p, t2p = tp[str(pri)]
            mix_base += r1p * t2p // t1p if t1p else 0
        mix = mix_base - (r1 * t2 // t1 if t1 else 0)
        resid = (r2 - r1) - nat - mix
        rows.append((int(nk), r1, r2, r2 - r1, nat, mix, resid))
    return pd.DataFrame(rows, columns=[
        "c_nationkey", "rev_h1_cents", "rev_h2_cents", "delta_cents",
        "national_effect_cents", "mix_effect_cents",
        "residual_cents"]).astype("int64")


def part_brand_hhi_decomposition(sf_dir: str) -> pd.DataFrame:
    """DECOMPOSABLE HHI of part-level revenue concentration — the
    between/within split a category manager needs: is revenue
    concentrated because a few BRANDS dominate, or because single
    parts dominate INSIDE brands? Part revenues fold as per-block
    (partkey, cents) partials (catalog-sized exchange), brands map
    on the driver grid, and every index closes as an exact integer
    bps division over Python-bigint squared sums (HUGEINT in the
    twin): hhi_total = 10^4*Sum r_p^2 // T^2, hhi_between over brand
    sums, per-brand weight and within-brand HHI (floors documented;
    no float anywhere). Output: one row per brand plus the global
    indices repeated as constant columns."""
    ds = _read(sf_dir, "lineitem",
               columns=["l_partkey", "l_extendedprice"])

    def partial(t: pa.Table) -> pa.Table:
        pk = t.column("l_partkey").to_numpy().astype(np.int64)
        cents = np.floor(t.column("l_extendedprice").to_numpy()
                         * 100).astype(np.int64)
        u, inv = np.unique(pk, return_inverse=True)
        return pa.table({
            "pk": pa.array(u),
            "c": pa.array(np.bincount(inv, weights=cents,
                                      minlength=len(u))
                          .astype(np.int64))})

    rev = (ds.map_batches(partial, batch_format="pyarrow")
           .to_pandas().groupby("pk", as_index=False)["c"].sum())
    brand = _read(sf_dir, "part",
                  columns=["p_partkey", "p_brand"]).to_pandas()
    rev = rev.merge(brand, left_on="pk", right_on="p_partkey")
    t_tot = sum(int(x) for x in rev["c"])
    sq_tot = sum(int(x) * int(x) for x in rev["c"])
    hhi_total = 10_000 * sq_tot // (t_tot * t_tot)
    rows = []
    sb_sq = 0
    for br, g in rev.groupby("p_brand"):
        s_b = sum(int(x) for x in g["c"])
        sq_b = sum(int(x) * int(x) for x in g["c"])
        sb_sq += s_b * s_b
        rows.append((str(br), len(g), s_b, 10_000 * s_b // t_tot,
                     10_000 * sq_b // (s_b * s_b) if s_b else 0))
    hhi_between = 10_000 * sb_sq // (t_tot * t_tot)
    rows.sort()
    df = pd.DataFrame(rows, columns=[
        "p_brand", "n_parts", "rev_cents", "w_bps",
        "hhi_within_bps"])
    df["hhi_total_bps"] = hhi_total
    df["hhi_between_bps"] = hhi_between
    return df.astype({c: "int64" for c in (
        "n_parts", "rev_cents", "w_bps", "hhi_within_bps",
        "hhi_total_bps", "hhi_between_bps")})


def customer_topk_stability(sf_dir: str, k: int = 100) -> pd.DataFrame:
    """TOP-K LEADERBOARD STABILITY between the two calendar halves —
    how much of the head of the customer-revenue ranking actually
    persists (the churn-of-the-whales metric behind every "top
    accounts" dashboard): per-half customer revenue folds through
    per-block (custkey, half, cents) partials, each half's top-k
    resolves under the exact (revenue desc, custkey) total order on
    the driver rollup, and the stability reports as pure integers —
    overlap count, Jaccard of the two sets in bps, and each half's
    entry threshold in cents. NO float; ZERO extra shuffle."""
    ds = _read(sf_dir, "orders",
               columns=["o_custkey", "o_orderdate", "o_totalprice"])

    def span(t: pa.Table) -> pa.Table:
        d = t.column("o_orderdate").cast(pa.int64()).to_numpy() \
            // 86_400_000_000
        return pa.table({"lo": pa.array([np.int64(d.min())]),
                         "hi": pa.array([np.int64(d.max())])})

    sp = ds.map_batches(span, batch_format="pyarrow").to_pandas()
    mid = (int(sp["lo"].min()) + int(sp["hi"].max())) // 2

    def partial(t: pa.Table) -> pa.Table:
        ck = t.column("o_custkey").to_numpy().astype(np.int64)
        dy = t.column("o_orderdate").cast(pa.int64()).to_numpy() \
            // 86_400_000_000
        cents = np.floor(t.column("o_totalprice").to_numpy() * 100) \
            .astype(np.int64)
        df = pd.DataFrame({"ck": ck, "h": (dy > mid).astype(np.int64),
                           "c": cents})
        g = df.groupby(["ck", "h"], as_index=False)["c"].sum()
        return pa.Table.from_pandas(g, preserve_index=False)

    agg = (ds.map_batches(partial, batch_format="pyarrow")
           .to_pandas().groupby(["ck", "h"], as_index=False)["c"]
           .sum())

    def topk(h: int):
        g = agg[agg["h"] == h]
        g = g.sort_values(["c", "ck"], ascending=[False, True],
                          kind="mergesort").head(k)
        return set(int(x) for x in g["ck"]), \
            int(g["c"].to_numpy(np.int64)[-1]) if len(g) else -1

    s1, thr1 = topk(0)
    s2, thr2 = topk(1)
    inter = len(s1 & s2)
    union = len(s1 | s2)
    return pd.DataFrame([(k, len(s1), len(s2), inter,
                          10_000 * inter // union if union else 0,
                          thr1, thr2)],
                        columns=["k", "n_top_h1", "n_top_h2",
                                 "overlap", "jaccard_bps",
                                 "thr_h1_cents", "thr_h2_cents"]) \
        .astype("int64")


def orders_gain_loss_asymmetry(sf_dir: str) -> pd.DataFrame:
    """GAIN/LOSS ASYMMETRY of the daily revenue stream — runs tests
    ask how often it rises; this asks how HARD it rises vs falls:
    over consecutive observed-day changes, the up/down/flat counts,
    the mean up-move and mean down-move in exact milli-cents
    (sign-normalized integer division), their cross-multiplied
    magnitude ratio in bps, and the single largest gain and loss
    with their days (first-day tie rule). Per-block daily partials —
    ZERO shuffle, NO float."""
    ds = _read(sf_dir, "orders", columns=["o_orderdate", "o_totalprice"])

    def partial(t: pa.Table) -> pa.Table:
        dy = t.column("o_orderdate").cast(pa.int64()).to_numpy() \
            // 86_400_000_000
        rev = np.floor(t.column("o_totalprice").to_numpy() * 100) \
            .astype(np.int64)
        u, inv = np.unique(dy, return_inverse=True)
        return pa.table({
            "dy": pa.array(u),
            "rev": pa.array(np.bincount(inv, weights=rev,
                                        minlength=len(u))
                            .astype(np.int64))})

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    agg = (parts.groupby("dy", as_index=False)["rev"].sum()
           .sort_values("dy", kind="mergesort"))
    dy = agg["dy"].to_numpy(np.int64)
    r = agg["rev"].to_numpy(np.int64)
    d = r[1:] - r[:-1]
    ddy = dy[1:]
    up = d[d > 0]
    dn = d[d < 0]
    n_up, n_dn = len(up), len(dn)
    n_flat = len(d) - n_up - n_dn
    s_up = sum(int(x) for x in up)
    s_dn = -sum(int(x) for x in dn)
    mean_up = 1000 * s_up // n_up if n_up else 0
    mean_dn = 1000 * s_dn // n_dn if n_dn else 0
    ratio = (10_000 * s_up * n_dn // (s_dn * n_up)
             if n_up and n_dn and s_dn else -1)
    gi = int(np.argmax(d)) if len(d) else -1
    li = int(np.argmin(d)) if len(d) else -1
    return pd.DataFrame([(len(d), n_up, n_dn, n_flat, mean_up,
                          mean_dn, ratio, int(d[gi]), int(ddy[gi]),
                          int(d[li]), int(ddy[li]))],
                        columns=["n_deltas", "n_up", "n_down",
                                 "n_flat", "mean_up_milli",
                                 "mean_down_milli",
                                 "up_down_ratio_bps",
                                 "max_gain_cents", "max_gain_dy",
                                 "max_loss_cents", "max_loss_dy"]) \
        .astype("int64")


def lineitem_arc_elasticity(sf_dir: str) -> pd.DataFrame:
    """ARC PRICE ELASTICITY along the discount ladder — the midpoint
    elasticity between every pair of ADJACENT whole-percent levels,
    treating (1 - discount) as the effective price in bps (p_a =
    10000 - 100a, exactly known): E = ((q2-q1)/(q2+q1)) /
    ((p2-p1)/(p2+p1)) cross-multiplies into the exact integer
    sign-normalized division sgn * 1000*|(s2*n1 - s1*n2)*(p2+p1)| //
    |(s2*n1 + s1*n2)*(p2-p1)| — NO rational mean is ever formed and
    NO float runs on either side. Constant 11-cell per-block
    partials — ZERO shuffle; the demand-curve companion to the
    monotonicity audit."""
    ds = _read(sf_dir, "lineitem", columns=["l_discount", "l_quantity"])

    def partial(t: pa.Table) -> pa.Table:
        a = np.floor(t.column("l_discount").to_numpy() * 100) \
            .astype(np.int64)
        q = np.floor(t.column("l_quantity").to_numpy()) \
            .astype(np.int64)
        return pa.table({
            "lvl": pa.array(np.arange(11, dtype=np.int64)),
            "n": pa.array(np.bincount(a, minlength=11)
                          .astype(np.int64)),
            "sq": pa.array(np.bincount(a, weights=q, minlength=11)
                           .astype(np.int64))})

    agg = (ds.map_batches(partial, batch_format="pyarrow")
           .to_pandas().groupby("lvl", as_index=False).sum()
           .sort_values("lvl"))
    agg = agg[agg["n"] > 0].reset_index(drop=True)
    rows = []
    for i in range(len(agg) - 1):
        l1, n1, s1 = (int(agg.loc[i, c]) for c in ("lvl", "n", "sq"))
        l2, n2, s2 = (int(agg.loc[i + 1, c])
                      for c in ("lvl", "n", "sq"))
        p1, p2 = 10_000 - 100 * l1, 10_000 - 100 * l2
        num = (s2 * n1 - s1 * n2) * (p2 + p1)
        den = (s2 * n1 + s1 * n2) * (p2 - p1)
        if den == 0:
            e = 0
        else:
            sgn = 1 if (num >= 0) == (den > 0) else -1
            e = sgn * (1000 * abs(num) // abs(den))
        rows.append((l1, l2, n1, n2, e))
    return pd.DataFrame(rows, columns=[
        "lvl_from", "lvl_to", "n_from", "n_to",
        "elasticity_milli"]).astype("int64")


def lang_token_simpson(sf_dir: str) -> pd.DataFrame:
    """TOKEN-LEVEL SIMPSON concentration per language — the log-free
    diversity reading on the vocabulary itself: the collision
    probability (two random tokens of a language being the SAME
    word) in exact bps from per-(lang, token) count folds, and the
    inverse-Simpson effective vocabulary in milli units — both pure
    integer divisions over Python-bigint / HUGEINT squared sums.
    One hashed-token-sized exchange; NO float."""
    ds = _read(sf_dir, "documents", columns=["lang", "text"])

    def partial(t: pa.Table) -> pa.Table:
        langs, toks = [], []
        for lg, s in zip(np.asarray(t.column("lang")).astype(object),
                         t.column("text").to_pylist()):
            ws = s.split()
            langs.extend([lg] * len(ws))
            toks.extend(ws)
        df = pd.DataFrame({"lang": langs, "tok": toks})
        g = df.groupby(["lang", "tok"], as_index=False).size()
        return pa.table({"lang": pa.array(g["lang"],
                                          type=pa.string()),
                         "tok": pa.array(g["tok"], type=pa.string()),
                         "f": pa.array(g["size"].to_numpy(np.int64))})

    agg = (ds.map_batches(partial, batch_format="pyarrow")
           .to_pandas().groupby(["lang", "tok"], as_index=False)["f"]
           .sum())
    rows = []
    for lg, g in agg.groupby("lang"):
        t_tot = sum(int(x) for x in g["f"])
        sq = sum(int(x) * int(x) for x in g["f"])
        rows.append((str(lg), t_tot, len(g),
                     10_000 * sq // (t_tot * t_tot),
                     1000 * t_tot * t_tot // sq))
    rows.sort()
    return pd.DataFrame(rows, columns=[
        "lang", "n_tokens", "vocab", "collision_bps",
        "inv_simpson_milli"]).astype(
        {c: "int64" for c in ("n_tokens", "vocab", "collision_bps",
                              "inv_simpson_milli")})


def orders_regression_to_mean(sf_dir: str) -> pd.DataFrame:
    """REGRESSION TO THE MEAN in consecutive order values — after an
    unusually large order, the next one is usually smaller, and a
    naive "our big customers are shrinking" readout is pure
    statistics: phase 1 takes the exact ceil-rank median order value
    from a cents-level histogram fold; phase 2 routes each
    customer's orders through one custkey%64 exchange, forms
    consecutive pairs under the (custkey, day, orderkey) total
    order, drops pairs whose FIRST value sits exactly on the median,
    and folds per-class (above/below) exact integer sums of the NEXT
    value. Output closes in pure integer milli/bps divisions — the
    hi-starter vs lo-starter next-order means and the pull toward
    each other. NO float."""
    ds = _read(sf_dir, "orders",
               columns=["o_orderkey", "o_custkey", "o_orderdate",
                        "o_totalprice"])

    def hist(t: pa.Table) -> pa.Table:
        cents = np.floor(t.column("o_totalprice").to_numpy() * 100) \
            .astype(np.int64)
        u, c = np.unique(cents, return_counts=True)
        return pa.table({"v": pa.array(u),
                         "c": pa.array(c.astype(np.int64))})

    h = (ds.map_batches(hist, batch_format="pyarrow")
         .to_pandas().groupby("v", as_index=False)["c"].sum()
         .sort_values("v", kind="mergesort"))
    cum = h["c"].to_numpy(np.int64).cumsum()
    n_all = int(cum[-1])
    med = int(h["v"].to_numpy(np.int64)[
        np.searchsorted(cum, -(-n_all // 2))])

    def derive(t: pa.Table) -> pa.Table:
        ck = t.column("o_custkey").to_numpy().astype(np.int64)
        return pa.table({
            "ck": pa.array(ck),
            "dy": pa.array(t.column("o_orderdate").cast(pa.int64())
                           .to_numpy() // 86_400_000_000),
            "ok": t.column("o_orderkey"),
            "v": pa.array(np.floor(t.column("o_totalprice")
                                   .to_numpy() * 100)
                          .astype(np.int64)),
            "bucket": pa.array((ck % 64).astype(np.int32))})

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        ck = g["ck"].to_numpy(np.int64)
        dy = g["dy"].to_numpy(np.int64)
        ok = g["ok"].to_numpy(np.int64)
        v = g["v"].to_numpy(np.int64)
        order = np.lexsort((ok, dy, ck))
        cks, vs = ck[order], v[order]
        same = np.empty(len(cks), dtype=bool)
        if len(cks):
            same[0] = False
            same[1:] = cks[1:] == cks[:-1]
        idx = np.flatnonzero(same)
        first, nxt = vs[idx - 1], vs[idx]
        hi = first > med
        lo = first < med
        return pd.DataFrame({
            "n_hi": [int(hi.sum())],
            "s_hi": [int(nxt[hi].sum())],
            "n_lo": [int(lo.sum())],
            "s_lo": [int(nxt[lo].sum())]})

    p = (ds.map_batches(derive, batch_format="pyarrow")
         .groupby("bucket").map_groups(fold, batch_format="pandas")
         .to_pandas())
    n_hi = int(p["n_hi"].sum())
    s_hi = sum(int(x) for x in p["s_hi"])
    n_lo = int(p["n_lo"].sum())
    s_lo = sum(int(x) for x in p["s_lo"])
    mean_hi = 1000 * s_hi // n_hi if n_hi else 0
    mean_lo = 1000 * s_lo // n_lo if n_lo else 0
    if n_hi and n_lo and s_lo:
        num = s_hi * n_lo - s_lo * n_hi
        sgn = 1 if num >= 0 else -1
        gap_bps = sgn * (10_000 * abs(num) // (s_lo * n_hi))
    else:
        gap_bps = -1
    return pd.DataFrame([(med, n_hi, n_lo, mean_hi, mean_lo,
                          gap_bps)],
                        columns=["median_cents", "n_pairs_hi",
                                 "n_pairs_lo", "next_mean_hi_milli",
                                 "next_mean_lo_milli",
                                 "hi_over_lo_gap_bps"]) \
        .astype("int64")


def lineitem_did_discount(sf_dir: str) -> pd.DataFrame:
    """DIFFERENCE-IN-DIFFERENCES on the discount ladder — did deep
    discounts (>= 5%) move quantity MORE than shallow ones between
    the two calendar halves, netting out the common trend: the four
    (treated, half) cells fold as exact integer (n, sum-quantity)
    per-block partials, each cell's mean reports in floored milli,
    and the DiD itself closes as ONE exact cross-multiplied
    sign-normalized integer division over the common denominator
    nT1*nT2*nC1*nC2 — no rational mean is ever formed, no float on
    either side, Python bigints / HUGEINT. Halves split at the
    integer midpoint of the observed ship-date span."""
    ds = _read(sf_dir, "lineitem",
               columns=["l_shipdate", "l_discount", "l_quantity"])

    def span(t: pa.Table) -> pa.Table:
        d = t.column("l_shipdate").cast(pa.int64()).to_numpy() \
            // 86_400_000_000
        return pa.table({"lo": pa.array([np.int64(d.min())]),
                         "hi": pa.array([np.int64(d.max())])})

    sp = ds.map_batches(span, batch_format="pyarrow").to_pandas()
    mid = (int(sp["lo"].min()) + int(sp["hi"].max())) // 2

    def partial(t: pa.Table) -> pa.Table:
        d = t.column("l_shipdate").cast(pa.int64()).to_numpy() \
            // 86_400_000_000
        disc = np.floor(t.column("l_discount").to_numpy() * 10000) \
            .astype(np.int64)
        q = np.floor(t.column("l_quantity").to_numpy()) \
            .astype(np.int64)
        cell = 2 * (disc >= 500).astype(np.int64) \
            + (d > mid).astype(np.int64)
        n = np.bincount(cell, minlength=4).astype(np.int64)
        s = np.bincount(cell, weights=q, minlength=4) \
            .astype(np.int64)
        return pa.table({"cell": pa.array(np.arange(4,
                                                    dtype=np.int64)),
                         "n": pa.array(n), "s": pa.array(s)})

    agg = (ds.map_batches(partial, batch_format="pyarrow")
           .to_pandas().groupby("cell", as_index=False).sum()
           .sort_values("cell"))
    n = [int(x) for x in agg["n"]]
    s = [int(x) for x in agg["s"]]
    nc1, nc2, nt1, nt2 = n
    sc1, sc2, st1, st2 = s
    means = [1000 * si // ni if ni else -1 for si, ni in zip(s, n)]
    if all(n):
        num = ((st2 * nt1 - st1 * nt2) * nc1 * nc2
               - (sc2 * nc1 - sc1 * nc2) * nt1 * nt2)
        den = nt1 * nt2 * nc1 * nc2
        sgn = 1 if num >= 0 else -1
        did_milli = sgn * (1000 * abs(num) // den)
    else:
        did_milli = -1
    return pd.DataFrame([(mid, nc1, nc2, nt1, nt2, means[0],
                          means[1], means[2], means[3], did_milli)],
                        columns=["mid_day", "n_ctl_h1", "n_ctl_h2",
                                 "n_trt_h1", "n_trt_h2",
                                 "mean_ctl_h1_milli",
                                 "mean_ctl_h2_milli",
                                 "mean_trt_h1_milli",
                                 "mean_trt_h2_milli", "did_milli"]) \
        .astype("int64")


def events_two_way_anova(sf_dir: str) -> pd.DataFrame:
    """TWO-WAY integer ANOVA of event volume over weekday x hour —
    how much of the load surface is the weekly cycle, how much the
    diurnal cycle, and how much genuine INTERACTION (the effect
    one-way scans cannot see): observations are the zero-filled
    (observed-day, hour) count cells, means floor to milli (the
    ``orders_dow_anova`` discipline) so grand/row/column/cell sums
    of squares stay exact Python-bigint integers, and each factor's
    share of total variation reports as a floored bps ratio with the
    residual defined by exact subtraction. One (day, hour) count
    exchange (calendar x 24 sized) — NO float on either side."""
    ds = _read(sf_dir, "events", columns=["ts"])

    def partial(t: pa.Table) -> pa.Table:
        us = t.column("ts").cast(pa.int64()).to_numpy()
        dy = us // 86_400_000_000
        hr = (us // 3_600_000_000) % 24
        pack = dy * 24 + hr
        u, cnt = np.unique(pack, return_counts=True)
        return pa.table({"dy": pa.array(u // 24),
                         "hr": pa.array(u % 24),
                         "c": pa.array(cnt.astype(np.int64))})

    agg = (ds.map_batches(partial, batch_format="pyarrow")
           .to_pandas().groupby(["dy", "hr"], as_index=False)["c"]
           .sum())
    days = np.sort(agg["dy"].unique())
    g = len(days)
    didx = {int(d): i for i, d in enumerate(days)}
    grid = np.zeros((g, 24), dtype=np.int64)
    for r in agg.itertuples():
        grid[didx[int(r.dy)], int(r.hr)] = int(r.c)
    dow = (days + 3) % 7
    n_obs = g * 24
    s_tot = int(grid.sum())
    q_tot = sum(int(x) * int(x) for x in grid.ravel())
    m = 1000 * s_tot // n_obs
    sst = 1_000_000 * q_tot - 2 * m * 1000 * s_tot + n_obs * m * m
    ssa = 0
    for w in range(7):
        sel = grid[dow == w]
        n_d = sel.size
        if n_d:
            m_d = 1000 * int(sel.sum()) // n_d
            ssa += n_d * (m_d - m) * (m_d - m)
    ssb = 0
    for h in range(24):
        col = grid[:, h]
        m_h = 1000 * int(col.sum()) // g
        ssb += g * (m_h - m) * (m_h - m)
    ss_cells = 0
    for w in range(7):
        sel = grid[dow == w]
        if not sel.size:
            continue
        for h in range(24):
            col = sel[:, h]
            n_c = len(col)
            m_c = 1000 * int(col.sum()) // n_c
            ss_cells += n_c * (m_c - m) * (m_c - m)
    ss_int = ss_cells - ssa - ssb
    ss_err = sst - ss_cells
    return pd.DataFrame([(n_obs, g,
                          10_000 * ssa // sst if sst else 0,
                          10_000 * ssb // sst if sst else 0,
                          (10_000 * ss_int // sst
                           if sst and ss_int >= 0 else
                           (-(10_000 * (-ss_int) // sst)
                            if sst else 0)),
                          (10_000 * ss_err // sst
                           if sst and ss_err >= 0 else
                           (-(10_000 * (-ss_err) // sst)
                            if sst else 0)))],
                        columns=["n_obs", "n_days", "eta_dow_bps",
                                 "eta_hour_bps", "eta_inter_bps",
                                 "eta_resid_bps"]).astype("int64")


def lineitem_capability_index(sf_dir: str) -> pd.DataFrame:
    """PROCESS CAPABILITY Cp/Cpk of the quantity column against its
    design limits [1, 50] — the SPC gate beside the p-chart: exact
    integer moments (N, S, Q) fold as constant per-block partials,
    the nearer spec distance resolves by the exact integer compare
    of USL*N - S vs S - LSL*N, and each index closes as ONE
    IEEE-order-matched float chain over sigma =
    sqrt((NQ - S^2)/(N(N-1))), floored to milli. Python bigints /
    HUGEINT feed the casts; ZERO shuffle."""
    import math

    ds = _read(sf_dir, "lineitem", columns=["l_quantity"])
    lsl, usl = 1, 50

    def partial(t: pa.Table) -> pa.Table:
        q = np.floor(t.column("l_quantity").to_numpy()) \
            .astype(np.int64)
        return pa.table({"n": pa.array([np.int64(len(q))]),
                         "s": pa.array([np.int64(q.sum())]),
                         "q": pa.array([np.int64((q * q).sum())])})

    p = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    n = int(p["n"].sum())
    s = sum(int(x) for x in p["s"])
    q = sum(int(x) for x in p["q"])
    var_num = n * q - s * s
    sigma = math.sqrt(float(var_num) / (float(n) * float(n - 1)))
    cp_milli = math.floor(
        float(usl - lsl) / (6.0 * sigma) * 1000.0)
    hi = usl * n - s
    lo = s - lsl * n
    near = hi if hi <= lo else lo
    cpk_milli = math.floor(
        (float(near) / float(n)) / (3.0 * sigma) * 1000.0)
    return pd.DataFrame([(n, s, var_num, cp_milli, cpk_milli)],
                        columns=["n_lines", "sum_qty", "var_num",
                                 "cp_milli", "cpk_milli"]) \
        .astype("int64")


def orders_theil_u2(sf_dir: str) -> pd.DataFrame:
    """THEIL'S U2 forecast-accuracy ratio — does the weekly cycle
    actually help prediction: seasonal-naive (use the revenue of 7
    days ago) against plain naive (use yesterday) over the
    zero-gapfilled calendar grid, squared-error masses as exact
    Python-bigint / HUGEINT integers, the ratio U2^2 as a pure
    integer bps division and U2 itself as the ONE IEEE-order-matched
    sqrt floored to milli (U2 < 1000 milli means the seasonal model
    wins). Per-block daily partials — ZERO shuffle."""
    import math

    ds = _read(sf_dir, "orders", columns=["o_orderdate", "o_totalprice"])

    def partial(t: pa.Table) -> pa.Table:
        dy = t.column("o_orderdate").cast(pa.int64()).to_numpy() \
            // 86_400_000_000
        rev = np.floor(t.column("o_totalprice").to_numpy() * 100) \
            .astype(np.int64)
        u, inv = np.unique(dy, return_inverse=True)
        return pa.table({
            "dy": pa.array(u),
            "rev": pa.array(np.bincount(inv, weights=rev,
                                        minlength=len(u))
                            .astype(np.int64))})

    parts = (ds.map_batches(partial, batch_format="pyarrow")
             .to_pandas().groupby("dy", as_index=False)["rev"].sum())
    days = parts["dy"].to_numpy(np.int64)
    lo, hi = int(days.min()), int(days.max())
    x = np.zeros(hi - lo + 1, dtype=np.int64)
    x[days - lo] = parts["rev"].to_numpy(np.int64)
    e1 = x[7:] - x[6:-1]
    e7 = x[7:] - x[:-7]
    n = len(e1)
    s1 = sum(int(v) * int(v) for v in e1)
    s7 = sum(int(v) * int(v) for v in e7)
    if s1 == 0:
        u2sq_bps, u2_milli = -1, -1
    else:
        u2sq_bps = 10_000 * s7 // s1
        u2_milli = math.floor(
            math.sqrt(float(s7) / float(s1)) * 1000.0)
    return pd.DataFrame([(n, u2sq_bps, u2_milli)],
                        columns=["n_forecasts", "u2sq_bps",
                                 "u2_milli"]).astype("int64")


def orders_chow_break(sf_dir: str) -> pd.DataFrame:
    """CHOW STRUCTURAL-BREAK TEST on the daily revenue trend — the
    parametric companion to the changepoint scan: fit the simple
    time-trend regression on the full span and on each calendar
    half, and ask whether two lines beat one. Each leg's residual
    mass enters as the exact Cramer numerator R = (n*Syy - Sy^2)*
    (n*Sxx - Sx^2) - (n*Sxy - Sx*Sy)^2 FLOORED once through its own
    denominator (ssr = R // BigX, documented), and F closes as the
    sign-safe integer division 1000*|(ssrp - ssr1 - ssr2)*(n-4)| //
    ((ssr1 + ssr2)*2). Daily revenue floors to KILO-DOLLAR units so
    every product stays inside HUGEINT (Python bigints on the
    driver). Day index is offset to the span start on both sides.
    Per-block daily partials — ZERO shuffle, NO float."""
    ds = _read(sf_dir, "orders", columns=["o_orderdate", "o_totalprice"])

    def partial(t: pa.Table) -> pa.Table:
        dy = t.column("o_orderdate").cast(pa.int64()).to_numpy() \
            // 86_400_000_000
        rev = np.floor(t.column("o_totalprice").to_numpy() * 100) \
            .astype(np.int64)
        u, inv = np.unique(dy, return_inverse=True)
        return pa.table({
            "dy": pa.array(u),
            "rev": pa.array(np.bincount(inv, weights=rev,
                                        minlength=len(u))
                            .astype(np.int64))})

    parts = (ds.map_batches(partial, batch_format="pyarrow")
             .to_pandas().groupby("dy", as_index=False)["rev"].sum()
             .sort_values("dy"))
    dy = parts["dy"].to_numpy(np.int64)
    d0 = int(dy.min())
    x_all = [int(d) - d0 for d in dy]
    y_all = [int(v) // 100_000 for v in parts["rev"]]
    mid = (d0 + int(dy.max())) // 2 - d0

    def moments(xs, ys):
        n = len(xs)
        sx = sum(xs)
        sy = sum(ys)
        sxx = sum(v * v for v in xs)
        syy = sum(v * v for v in ys)
        sxy = sum(a * b for a, b in zip(xs, ys))
        bigx = n * sxx - sx * sx
        r = (n * syy - sy * sy) * bigx - (n * sxy - sx * sy) ** 2
        return n, bigx, r

    np_, xp, rp = moments(x_all, y_all)
    h1 = [(a, b) for a, b in zip(x_all, y_all) if a <= mid]
    h2 = [(a, b) for a, b in zip(x_all, y_all) if a > mid]
    n1, x1, r1 = moments([a for a, _ in h1], [b for _, b in h1])
    n2, x2, r2 = moments([a for a, _ in h2], [b for _, b in h2])
    ssrp = rp // xp if xp > 0 else 0
    ssr1 = r1 // x1 if x1 > 0 else 0
    ssr2 = r2 // x2 if x2 > 0 else 0
    num = (ssrp - ssr1 - ssr2) * (np_ - 4)
    den = (ssr1 + ssr2) * 2
    if den > 0:
        sgn = 1 if num >= 0 else -1
        f_milli = sgn * (1000 * abs(num) // den)
    else:
        f_milli = -1
    return pd.DataFrame([(np_, n1, n2, mid + d0, f_milli)],
                        columns=["n_days", "n_h1", "n_h2",
                                 "break_dy", "f_milli"]) \
        .astype("int64")


def keyspace_contiguity_audit(sf_dir: str) -> pd.DataFrame:
    """KEYSPACE CONTIGUITY audit across the three event-sourced id
    columns — the before-you-shard sanity check that catches silent
    row loss and duplicate ingestion in one pass per table: rows,
    distinct ids, min/max, the hole count (span minus distinct) and
    the duplicate count (rows minus distinct), all exact integers
    from per-block (count, distinct-via-unique, min, max) partials
    merged on the driver (distinct folds exactly because each
    block's unique set is re-deduped globally at id cardinality only
    when blocks disagree — here via a value-level fold). NO float;
    ZERO row shuffle beyond the id-level fold."""
    rows = []
    for table, col in (("documents", "doc_id"), ("events", "event_id"),
                       ("orders", "o_orderkey")):
        ds = _read(sf_dir, table, columns=[col])

        def partial(t: pa.Table, c=col) -> pa.Table:
            v = t.column(c).to_numpy().astype(np.int64)
            u, cnt = np.unique(v, return_counts=True)
            return pa.table({"id": pa.array(u),
                             "n": pa.array(cnt.astype(np.int64))})

        g = (ds.map_batches(partial, batch_format="pyarrow")
             .to_pandas().groupby("id", as_index=False)["n"].sum())
        n = int(g["n"].sum())
        nd = len(g)
        mn = int(g["id"].min())
        mx = int(g["id"].max())
        rows.append((table, n, nd, mn, mx, mx - mn + 1 - nd, n - nd))
    return pd.DataFrame(rows, columns=[
        "tbl", "n_rows", "n_distinct", "min_id", "max_id",
        "n_holes", "n_dups"]).astype(
        {c: "int64" for c in ("n_rows", "n_distinct", "min_id",
                              "max_id", "n_holes", "n_dups")})


_WK_COS = np.array([1000000, 623489, -222521, -900969, -900969,
                    -222521, 623489], dtype=np.int64)
_WK_SIN = np.array([0, 781831, 974927, 433883, -433884, -974928,
                    -781832], dtype=np.int64)


def orders_weekly_periodogram(sf_dir: str) -> pd.DataFrame:
    """WEEKLY PERIODOGRAM of the daily revenue series — spectral
    seasonality on an integer trig lattice: over the longest
    complete-week window of the zero-gapfilled calendar, each day's
    kilo-dollar revenue x_d is demeaned EXACTLY as y_d = n*x_d - S
    (so sum(y)=0 holds in integers, no rational mean is ever
    formed), residue sums R_j = n*X_j - W*S collapse the DFT at the
    weekly harmonics k=1..3 to seven terms each, and the power
    P_k = C_k^2 + S_k^2 folds through the FIXED 7-point lattice
    floor(1e6*cos/sin(2*pi*j/7)) shared verbatim with the twin so no
    libm call runs on either side. Per-harmonic and total weekly
    energy shares close as pure integer bps against the exact
    Parseval mass n*SS_y*1e12 (SS_y counts every zero-gap day as
    y=-S, computed without materializing the grid). Kilo-dollar
    units keep every square inside HUGEINT; Python bigints on the
    driver. Per-block daily partials — ZERO shuffle, NO float."""
    ds = _read(sf_dir, "orders", columns=["o_orderdate", "o_totalprice"])

    def partial(t: pa.Table) -> pa.Table:
        dy = t.column("o_orderdate").cast(pa.int64()).to_numpy() \
            // 86_400_000_000
        rev = np.floor(t.column("o_totalprice").to_numpy() * 100) \
            .astype(np.int64)
        u, inv = np.unique(dy, return_inverse=True)
        return pa.table({
            "dy": pa.array(u),
            "rev": pa.array(np.bincount(inv, weights=rev,
                                        minlength=len(u))
                            .astype(np.int64))})

    agg = (ds.map_batches(partial, batch_format="pyarrow")
           .to_pandas().groupby("dy", as_index=False)["rev"].sum())
    dy = agg["dy"].to_numpy(np.int64)
    rv = agg["rev"].to_numpy(np.int64)
    dmin = int(dy.min())
    weeks = (int(dy.max()) - dmin + 1) // 7
    n = 7 * weeks
    sel = (dy - dmin) < n
    d0 = (dy[sel] - dmin).astype(np.int64)
    xv = (rv[sel] // 100_000).astype(np.int64)      # kilo-dollars
    s = int(xv.sum())
    n_obs = len(xv)
    ssy = sum((n * int(x) - s) ** 2 for x in xv) \
        + (n - n_obs) * s * s
    xj = np.zeros(7, dtype=object)
    for j, x in zip(d0 % 7, xv):
        xj[j] += int(x)
    r = [n * int(xj[j]) - weeks * s for j in range(7)]
    p = {}
    for k in (1, 2, 3):
        ck = sum(r[j] * int(_WK_COS[(k * j) % 7]) for j in range(7))
        sk = sum(r[j] * int(_WK_SIN[(k * j) % 7]) for j in range(7))
        p[k] = ck * ck + sk * sk
    den = 10 ** 12 * n * ssy
    p_bps = {k: 10_000 * 2 * p[k] // den for k in p}
    share = 10_000 * 2 * (p[1] + p[2] + p[3]) // den
    peak = max((1, 2, 3), key=lambda k: (p[k], -k))
    return pd.DataFrame([(n, weeks, p_bps[1], p_bps[2], p_bps[3],
                          share, peak)],
                        columns=["n_days", "n_weeks", "p1_bps",
                                 "p2_bps", "p3_bps",
                                 "weekly_share_bps", "peak_k"]) \
        .astype("int64")


def lineitem_energy_distance(sf_dir: str) -> pd.DataFrame:
    """ENERGY-DISTANCE two-sample tests between every pair of return
    flags on the quantity column — the modern all-moments
    distribution test (Szekely-Rizzo), run EXACTLY: the bounded
    1..50 quantity domain turns every pairwise-|X-Y| expectation
    into a 50x50 histogram cross sum (per-block (flag, qty) bincount
    partials, constant exchange), so A = sum c1[u]c2[v]|u-v| and the
    within masses B, C are exact Python bigints, D = 2A/(n1n2) -
    B/n1^2 - C/n2^2 closes over the single common denominator
    n1^2*n2^2 with no rational mean ever formed, the Szekely T =
    n1n2/(n1+n2)*D stays one staged integer division, and the
    E-coefficient D/(2A/(n1n2)) reports in bps. HUGEINT-safe at
    bench scale; ZERO shuffle, NO float anywhere."""
    ds = _read(sf_dir, "lineitem",
               columns=["l_returnflag", "l_quantity"])

    def partial(t: pa.Table) -> pa.Table:
        f = np.asarray(t.column("l_returnflag")).astype(object)
        q = np.floor(t.column("l_quantity").to_numpy()) \
            .astype(np.int64)
        code, uniq = pd.factorize(f)
        pack = code.astype(np.int64) * 64 + q
        u, cnt = np.unique(pack, return_counts=True)
        return pa.table({
            "f": pa.array(np.asarray(uniq, dtype=object)[u // 64],
                          type=pa.string()),
            "q": pa.array((u % 64).astype(np.int64)),
            "c": pa.array(cnt.astype(np.int64))})

    agg = (ds.map_batches(partial, batch_format="pyarrow")
           .to_pandas().groupby(["f", "q"], as_index=False)["c"]
           .sum())
    flags = sorted(agg["f"].unique())
    hist = {}
    for fl in flags:
        g = agg[agg["f"] == fl]
        h = np.zeros(51, dtype=np.int64)
        h[g["q"].to_numpy(np.int64)] = g["c"].to_numpy(np.int64)
        hist[fl] = h

    def cross(h1, h2):
        return sum(int(h1[u]) * int(h2[v]) * abs(u - v)
                   for u in range(51) for v in range(51)
                   if h1[u] and h2[v])

    rows = []
    for i in range(len(flags)):
        for j in range(i + 1, len(flags)):
            fa, fb = flags[i], flags[j]
            n1 = int(hist[fa].sum())
            n2 = int(hist[fb].sum())
            a2 = cross(hist[fa], hist[fb])
            b2 = cross(hist[fa], hist[fa])
            c2 = cross(hist[fb], hist[fb])
            num = 2 * a2 * n1 * n2 - b2 * n2 * n2 - c2 * n1 * n1
            den = n1 * n1 * n2 * n2
            rows.append((fa, fb, n1, n2,
                         1000 * num // den,
                         1000 * n1 * n2 * num // ((n1 + n2) * den),
                         10_000 * num // (2 * a2 * n1 * n2)))
    return pd.DataFrame(rows, columns=[
        "flag_a", "flag_b", "n_a", "n_b", "e_milli", "t_milli",
        "ecoef_bps"]).astype(
        {c: "int64" for c in ("n_a", "n_b", "e_milli", "t_milli",
                              "ecoef_bps")})


def events_cochran_q(sf_dir: str) -> pd.DataFrame:
    """COCHRAN'S Q — the k-treatment generalization of McNemar on
    binary outcomes with users as blocks: treatment j is "did this
    user's (i, j) event count exceed the global mean (user, type)
    intensity" — decided by the exact cross-multiplied integer
    compare c_ij * P > T_e (P observed pairs, T_e total events), a
    bar that stays heterogeneous at every scale where plain
    incidence saturates — so the blocked design asks whether HEAVY
    engagement concentrates in some types beyond per-user
    propensity. Per-block (user, type) count
    partials collapse the stream through one exchange before the
    >=2 threshold; with L_i the per-user
    type count and G_j the per-type user count, Q closes in PURE
    integers as q_milli = 1000*(k-1)*(k*sum(G^2) - T^2) //
    (k*T - sum(L^2)) (the identity k*sum((G-T/k)^2) =
    (k*sum(G^2)-T^2)/k clears the rational mean; all-equal blocks
    cancel from both sides of the statistic, the classical rule,
    so no filter is needed). NO float on either side."""
    ds = _read(sf_dir, "events", columns=["user_id", "event_type"])

    def partial(t: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "u": t.column("user_id").to_numpy().astype(np.int64),
            "et": np.asarray(t.column("event_type")).astype(object)})
        g = df.groupby(["u", "et"], as_index=False).size()
        return pa.table({"u": pa.array(g["u"].to_numpy(np.int64)),
                         "et": pa.array(g["et"].to_numpy(object),
                                        type=pa.string()),
                         "c": pa.array(g["size"].to_numpy(np.int64))})

    cnt = (ds.map_batches(partial, batch_format="pyarrow")
           .to_pandas().groupby(["u", "et"], as_index=False)["c"]
           .sum())
    p_obs = len(cnt)
    t_e = int(cnt["c"].sum())
    inc = cnt[cnt["c"].to_numpy(np.int64) * p_obs > t_e]
    li = inc.groupby("u").size().to_numpy(np.int64)
    gj = inc.groupby("et").size().to_numpy(np.int64)
    nu = len(li)
    k = len(gj)
    t_tot = int(li.sum())
    sl2 = sum(int(x) * int(x) for x in li)
    sg2 = sum(int(x) * int(x) for x in gj)
    q_milli = 1000 * (k - 1) * (k * sg2 - t_tot * t_tot) \
        // (k * t_tot - sl2)
    return pd.DataFrame([(nu, k, t_tot, q_milli, k - 1)],
                        columns=["n_users", "n_types", "t_total",
                                 "q_milli", "df"]).astype("int64")


def lineitem_hilbert_locality(sf_dir: str) -> pd.DataFrame:
    """SPACE-FILLING-CURVE LAYOUT audit — Hilbert vs Z-order vs
    row-major clustering of the occupied (partkey & 255,
    suppkey & 255) cell population: each layout linearizes the
    256x256 key grid, and its DILATION (total Manhattan distance
    between consecutive cells in index order; on the full grid the
    Hilbert curve attains the n-1 optimum, row-major pays the row
    wrap, Z-order pays the quadrant jumps) measures how well a
    range scan of the sorted file preserves 2-D key locality — the
    decision metric for choosing a sort key at 100 TB. Occupied
    cells arrive as per-block distinct partials (<= 65536 rows
    total); the full 8-step Hilbert xy->d bit algorithm runs
    vectorized here and is reproduced step-for-step by the twin's
    unrolled CTE chain. Pure integers end to end."""
    ds = _read(sf_dir, "lineitem", columns=["l_partkey", "l_suppkey"])

    def partial(t: pa.Table) -> pa.Table:
        a = t.column("l_partkey").to_numpy().astype(np.int64) & 255
        b = t.column("l_suppkey").to_numpy().astype(np.int64) & 255
        u = np.unique(a * 256 + b)
        return pa.table({"cell": pa.array(u)})

    cells = np.unique(ds.map_batches(partial, batch_format="pyarrow")
                      .to_pandas()["cell"].to_numpy(np.int64))
    a = cells // 256
    b = cells % 256
    x = a.copy()
    y = b.copy()
    hd = np.zeros_like(x)
    s = 128
    while s > 0:
        rx = (x // s) % 2
        ry = (y // s) % 2
        hd += s * s * ((3 * rx) ^ ry)
        m0 = ry == 0
        m1 = m0 & (rx == 1)
        x2 = np.where(m1, 255 - x, x)
        y2 = np.where(m1, 255 - y, y)
        x, y = np.where(m0, y2, x2), np.where(m0, x2, y2)
        s //= 2
    zd = np.zeros_like(a)
    for k in range(8):
        zd += ((a // (1 << k)) % 2) * (1 << (2 * k)) \
            + ((b // (1 << k)) % 2) * (1 << (2 * k + 1))
    rows = []
    for name, idx in (("hilbert", hd), ("rowmajor", a * 256 + b),
                      ("zorder", zd)):
        o = np.argsort(idx)
        tot = int(np.abs(np.diff(a[o])).sum()
                  + np.abs(np.diff(b[o])).sum())
        rows.append((name, len(cells), tot,
                     1000 * tot // (len(cells) - 1)))
    return pd.DataFrame(rows, columns=[
        "layout", "n_cells", "dilation_total",
        "dilation_avg_milli"]).astype(
        {c: "int64" for c in ("n_cells", "dilation_total",
                              "dilation_avg_milli")})


def orders_pettitt_test(sf_dir: str) -> pd.DataFrame:
    """PETTITT single-changepoint test on the daily revenue series —
    the rank-based (distribution-free) companion to the Chow break:
    U_t = sum_{i<=t} 2*midrank_i - t*(n+1) stays a PURE integer by
    carrying DOUBLED mid-ranks (2*mid = 2*smaller + ties + 1, exact
    under ties), K = max_{t<n} |U_t| locates the most likely break at
    the EARLIEST argmax, and the classical significance approximation
    p ~ 2*exp(-6K^2/(n^3+n^2)) is the single IEEE-order-matched float
    expression on both sides (integer num/den built first, one
    divide, one exp, floored to micro units). Per-block daily-revenue
    partials collapse the stream — ZERO shuffle; the O(n)-day rank
    pass runs on the calendar-bounded grid, never on rows."""
    import math

    ds = _read(sf_dir, "orders", columns=["o_orderdate", "o_totalprice"])

    def partial(t: pa.Table) -> pa.Table:
        dy = t.column("o_orderdate").cast(pa.int64()).to_numpy() \
            // 86_400_000_000
        rev = np.floor(t.column("o_totalprice").to_numpy() * 100) \
            .astype(np.int64)
        u, inv = np.unique(dy, return_inverse=True)
        return pa.table({
            "dy": pa.array(u),
            "rev": pa.array(np.bincount(inv, weights=rev,
                                        minlength=len(u))
                            .astype(np.int64))})

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    agg = (parts.groupby("dy", as_index=False)["rev"].sum()
           .sort_values("dy", kind="mergesort"))
    r = agg["rev"].to_numpy(np.int64)
    dy = agg["dy"].to_numpy(np.int64)
    n = len(r)
    _, inv, counts = np.unique(r, return_inverse=True,
                               return_counts=True)
    smaller = np.concatenate(([0], np.cumsum(counts)[:-1]))
    r2 = 2 * smaller[inv] + counts[inv] + 1
    u = np.cumsum(r2) - np.arange(1, n + 1, dtype=np.int64) * (n + 1)
    au = np.abs(u[:-1])
    k_stat = int(au.max())
    t_hat = int(np.argmax(au)) + 1
    num = 6 * k_stat * k_stat
    den = n ** 3 + n ** 2
    p_micro = math.floor(
        2.0 * math.exp(-(float(num) / float(den))) * 1000000.0)
    return pd.DataFrame(
        [(n, k_stat, t_hat, int(dy[t_hat - 1]), p_micro)],
        columns=["n_days", "k_stat", "t_hat", "dy_hat", "p_micro"]) \
        .astype("int64")


def events_bowker_symmetry(sf_dir: str) -> pd.DataFrame:
    """BOWKER symmetry test on the user-sequence transition matrix —
    the k-type generalization of McNemar: is traffic between every
    pair of event types BALANCED (n_ij vs n_ji), or does the session
    graph have preferred directions? Off-diagonal transition counts
    come from the shared one-exchange transition kernel
    (``event_transitions``); each unordered pair folds to chi2's term
    1000*(n_ij-n_ji)^2 // (n_ij+n_ji) — the numerator is a square so
    the floor-division is sign-safe and BOTH sides floor per pair
    before the order-independent integer sum. df = number of occupied
    unordered pairs. NO float anywhere."""
    cnt = event_transitions(sf_dir)
    c = cnt[cnt["from_type"] != cnt["to_type"]].copy()
    fw = (c["from_type"] < c["to_type"]).to_numpy()
    c["i"] = np.where(fw, c["from_type"], c["to_type"])
    c["j"] = np.where(fw, c["to_type"], c["from_type"])
    nn = c["n"].to_numpy(np.int64)
    c["nij"] = np.where(fw, nn, 0)
    c["nji"] = np.where(fw, 0, nn)
    p = c.groupby(["i", "j"], as_index=False)[["nij", "nji"]].sum()
    d = p["nij"].to_numpy(np.int64) - p["nji"].to_numpy(np.int64)
    s = p["nij"].to_numpy(np.int64) + p["nji"].to_numpy(np.int64)
    chi2_milli = int((1000 * d * d // s).sum())
    return pd.DataFrame([(len(p), int(s.sum()), chi2_milli)],
                        columns=["n_pairs", "n_offdiag",
                                 "chi2_milli"]).astype("int64")


def events_permutation_entropy(sf_dir: str) -> pd.DataFrame:
    """BANDT-POMPE ordinal-pattern census of the daily event-count
    series (order 3): each consecutive day triple (x1,x2,x3) over the
    observed-day sequence is classified into one of the 6 permutation
    patterns with the STABLE tie rule (equal values rank by time
    order, i.e. rank_i counts earlier-j ties as smaller) — encoded
    EXPLICITLY as r1*9+r2*3+r3 with r1=[x2<x1]+[x3<x1],
    r2=[x1<=x2]+[x3<x2], r3=[x1<=x3]+[x2<=x3], so both sides apply
    the identical comparison lattice and no sort/argsort semantics
    can diverge. The 6 valid codes {5,7,11,15,19,21} are gridded in
    with zero fill; shares in exact integer bps. Monotone-heavy
    census (codes 5/21) = trending regime; balanced = complex. Daily
    partials collapse the stream per block — ZERO shuffle; the
    triple sweep runs on the calendar-sized vector. NO float."""
    ds = _read(sf_dir, "events", columns=["ts"])

    def partial(t: pa.Table) -> pa.Table:
        d = t.column("ts").cast(pa.int64()).to_numpy() // _DAY_US
        u, cnt = np.unique(d, return_counts=True)
        return pa.table({"dy": pa.array(u),
                         "c": pa.array(cnt.astype(np.int64))})

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    agg = (parts.groupby("dy", as_index=False)["c"].sum()
           .sort_values("dy", kind="mergesort"))
    x = agg["c"].to_numpy(np.int64)
    x1, x2, x3 = x[:-2], x[1:-1], x[2:]
    r1 = (x2 < x1).astype(np.int64) + (x3 < x1)
    r2 = (x1 <= x2).astype(np.int64) + (x3 < x2)
    r3 = (x1 <= x3).astype(np.int64) + (x2 <= x3)
    pat = r1 * 9 + r2 * 3 + r3
    tot = len(pat)
    cnt = np.bincount(pat, minlength=22).astype(np.int64)
    codes = np.array([5, 7, 11, 15, 19, 21], dtype=np.int64)
    n = cnt[codes]
    return pd.DataFrame({"pat_code": codes, "n": n,
                         "share_bps": 10000 * n // tot}) \
        .astype("int64")


def orders_newey_west(sf_dir: str) -> pd.DataFrame:
    """NEWEY-WEST (HAC) long-run variance of the gapfilled daily
    revenue series at Bartlett bandwidth L=7 — "how much does serial
    correlation inflate the variance of the daily mean?" — kept EXACT
    by clearing both rationals: demeaning as y_t = n*x_t - S (so
    sum(y)=0 with no mean ever formed) and the Bartlett weights
    1-k/(L+1) cleared by (L+1), giving the pure integer
    lrv_num = (L+1)*g0 + 2*sum_k (L+1-k)*g_k over the exact
    autocovariance numerators g_k = sum y_t*y_{t+k}. The inflation
    ratio and the effective-sample-size ESS = n*(L+1)*g0/lrv_num
    close as sign-safe integer milli divisions. Revenue folds to
    mega-dollar units (cents // 10^8) so every square stays far
    inside int64/HUGEINT at any SF. Per-block daily partials — ZERO
    shuffle; the lag sweep runs on the calendar-sized vector."""
    ds = _read(sf_dir, "orders", columns=["o_orderdate", "o_totalprice"])

    def partial(t: pa.Table) -> pa.Table:
        dy = t.column("o_orderdate").cast(pa.int64()).to_numpy() \
            // 86_400_000_000
        rev = np.floor(t.column("o_totalprice").to_numpy() * 100) \
            .astype(np.int64)
        u, inv = np.unique(dy, return_inverse=True)
        return pa.table({
            "dy": pa.array(u),
            "cents": pa.array(np.bincount(inv, weights=rev,
                                          minlength=len(u))
                              .astype(np.int64))})

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    agg = parts.groupby("dy", as_index=False)["cents"].sum()
    days = agg["dy"].to_numpy(np.int64)
    lo, hi = int(days.min()), int(days.max())
    vec = np.zeros(hi - lo + 1, dtype=np.int64)
    vec[days - lo] = agg["cents"].to_numpy(np.int64)
    x = vec // 100_000_000
    n = len(x)
    s = int(x.sum())
    y = n * x - s
    big = 8
    g = [int(np.dot(y, y))] + [int(np.dot(y[:-k], y[k:]))
                               for k in range(1, big)]
    lrv_num = big * g[0] + 2 * sum((big - k) * g[k]
                                   for k in range(1, big))
    den = big * g[0]
    sgn = 1 if lrv_num > 0 else (-1 if lrv_num < 0 else 0)
    ratio_milli = sgn * (1000 * abs(lrv_num) // den)
    ess_milli = 1000 * n * den // lrv_num if lrv_num > 0 else -1
    row = [n] + g + [lrv_num, ratio_milli, ess_milli]
    return pd.DataFrame([row], columns=(
        ["n_days"] + [f"g{k}" for k in range(big)]
        + ["lrv_num", "ratio_milli", "ess_milli"])).astype("int64")


def lineitem_discount_rdd(sf_dir: str) -> pd.DataFrame:
    """REGRESSION DISCONTINUITY at the quantity cutoff c=25 with
    bandwidth 10 (qty in [15,34]) — does line revenue JUMP at the
    bulk threshold beyond what the local linear trend explains? Two
    exact Cramer OLS fits of dollar revenue on quantity, one per
    side; the fitted value AT the cutoff per side is the single
    rational (Sy*Sxx - Sx*Sxy + c*(n*Sxy - Sx*Sy)) / (n*Sxx - Sx^2)
    and the jump closes fully cross-multiplied over the product
    denominator — Python bigints here, HUGEINT in the twin, every
    division a sign-normalized integer floor. Five constant moment
    cells per side per block — ZERO shuffle, no float anywhere."""
    ds = _read(sf_dir, "lineitem",
               columns=["l_quantity", "l_extendedprice"])

    def partial(t: pa.Table) -> pa.Table:
        q = np.floor(t.column("l_quantity").to_numpy()).astype(np.int64)
        yd = np.floor(t.column("l_extendedprice").to_numpy() * 100) \
            .astype(np.int64) // 100
        m = (q >= 15) & (q <= 34)
        q, yd = q[m], yd[m]
        side = (q >= 25).astype(np.int64)
        out = np.zeros((2, 5), dtype=np.int64)
        for sd in (0, 1):
            mm = side == sd
            qq, yy = q[mm], yd[mm]
            out[sd] = (len(qq), qq.sum(), yy.sum(),
                       int((qq * qq).sum()), int((qq * yy).sum()))
        return pa.table({"side": pa.array(np.arange(2, dtype=np.int64)),
                         "n": pa.array(out[:, 0]),
                         "sx": pa.array(out[:, 1]),
                         "sy": pa.array(out[:, 2]),
                         "sxx": pa.array(out[:, 3]),
                         "sxy": pa.array(out[:, 4])})

    agg = (ds.map_batches(partial, batch_format="pyarrow")
           .to_pandas().groupby("side").sum())

    def fit(sd):
        n, sx, sy, sxx, sxy = (int(agg.loc[sd, c]) for c in
                               ("n", "sx", "sy", "sxx", "sxy"))
        den = n * sxx - sx * sx
        nums = n * sxy - sx * sy
        numv = sy * sxx - sx * sxy + 25 * nums
        return n, den, nums, numv

    def sdiv(num, den, scale=1000):
        sgn = 1 if num > 0 else (-1 if num < 0 else 0)
        return sgn * (scale * abs(num) // den)

    nl, denl, numsl, numvl = fit(0)
    nr, denr, numsr, numvr = fit(1)
    jump = sdiv(numvr * denl - numvl * denr, denr * denl)
    return pd.DataFrame([(nl, nr, sdiv(numsl, denl), sdiv(numsr, denr),
                          sdiv(numvl, denl), sdiv(numvr, denr), jump)],
                        columns=["n_left", "n_right", "slope_l_milli",
                                 "slope_r_milli", "v_l_milli",
                                 "v_r_milli", "jump_milli"]) \
        .astype("int64")


def events_allan_variance(sf_dir: str) -> pd.DataFrame:
    """ALLAN VARIANCE of the gapfilled daily event-count series at
    averaging scales tau = 1/2/4/8 days — the clock-stability
    diagnostic that separates white noise (AVAR ~ 1/tau) from random
    walk / drift (AVAR flat or growing): complete non-overlapping
    tau-day windows W_i, numerator sum((W_{i+1}-W_i)^2) EXACT, and
    the classical normalization 2*(m-1)*tau^2 applied as one integer
    milli floor per scale (m<2 scales report the -1 sentinel). Daily
    partials collapse the stream per block — ZERO shuffle; the scale
    sweep runs on the calendar-sized vector. NO float anywhere."""
    ds = _read(sf_dir, "events", columns=["ts"])

    def partial(t: pa.Table) -> pa.Table:
        d = t.column("ts").cast(pa.int64()).to_numpy() // _DAY_US
        u, cnt = np.unique(d, return_counts=True)
        return pa.table({"dy": pa.array(u),
                         "c": pa.array(cnt.astype(np.int64))})

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    agg = parts.groupby("dy", as_index=False)["c"].sum()
    days = agg["dy"].to_numpy(np.int64)
    lo, hi = int(days.min()), int(days.max())
    vec = np.zeros(hi - lo + 1, dtype=np.int64)
    vec[days - lo] = agg["c"].to_numpy(np.int64)
    n = len(vec)
    rows = []
    for tau in (1, 2, 4, 8):
        m = n // tau
        if m < 2:
            rows.append((tau, m, 0, -1))
            continue
        w = vec[:m * tau].reshape(m, tau).sum(axis=1)
        dw = np.diff(w)
        num = int((dw * dw).sum())
        rows.append((tau, m, num,
                     1000 * num // (2 * (m - 1) * tau * tau)))
    return pd.DataFrame(rows, columns=["tau", "m_windows",
                                       "sum_sq_diff", "avar_milli"]) \
        .astype("int64")


def lineitem_zonemap_pruning(sf_dir: str) -> pd.DataFrame:
    """ZONE-MAP (row-group min/max) PRUNING audit — the storage-layout
    question that decides 100 TB scan cost: with lineitem segmented in
    insertion-key order (l_orderkey // 2048, the row-group proxy), how
    many segments does a ship-date range predicate actually prune via
    min/max metadata, and what is the SCAN AMPLIFICATION (rows touched
    per row matched)? Three deterministic predicate windows anchored to
    the observed span (a week at the 1/4 point, a month at midspan, the
    top quarter); per-segment (count, min, max, per-predicate match
    counts) fold as ONE partial per block through a driver fold that is
    segment-cardinality-sized, never row-sized. Classification
    pruned/full/straddle and amp_milli = 1000*scanned//matched are pure
    integers. A tiny span pre-pass anchors the windows — the only
    second scan; ZERO shuffle."""
    ds = _read(sf_dir, "lineitem", columns=["l_orderkey", "l_shipdate"])

    def span(t: pa.Table) -> pa.Table:
        d = t.column("l_shipdate").cast(pa.int64()).to_numpy() \
            // 86_400_000_000
        return pa.table({"lo": pa.array([np.int64(d.min())]),
                         "hi": pa.array([np.int64(d.max())])})

    sp = ds.map_batches(span, batch_format="pyarrow").to_pandas()
    mn, mx = int(sp["lo"].min()), int(sp["hi"].max())
    spn = mx - mn
    preds = [("p25_week", mn + spn // 4, mn + spn // 4 + 6),
             ("p50_month", mn + spn // 2, mn + spn // 2 + 29),
             ("p75_tail", mn + (3 * spn) // 4, mx)]

    def partial(t: pa.Table) -> pa.Table:
        seg = t.column("l_orderkey").to_numpy().astype(np.int64) // 2048
        d = t.column("l_shipdate").cast(pa.int64()).to_numpy() \
            // 86_400_000_000
        u, inv = np.unique(seg, return_inverse=True)
        k = len(u)
        nn = np.bincount(inv, minlength=k).astype(np.int64)
        smn = np.full(k, np.iinfo(np.int64).max, np.int64)
        np.minimum.at(smn, inv, d)
        smx = np.full(k, np.iinfo(np.int64).min, np.int64)
        np.maximum.at(smx, inv, d)
        cols = {"seg": pa.array(u), "n": pa.array(nn),
                "smn": pa.array(smn), "smx": pa.array(smx)}
        for name, plo, phi in preds:
            mt = ((d >= plo) & (d <= phi)).astype(np.int64)
            cols["m_" + name] = pa.array(
                np.bincount(inv, weights=mt, minlength=k)
                .astype(np.int64))
        return pa.table(cols)

    raw = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    g = raw.groupby("seg").agg(
        n=("n", "sum"), smn=("smn", "min"), smx=("smx", "max"),
        **{"m_" + p: ("m_" + p, "sum") for p, _, _ in preds})
    rows = []
    for name, plo, phi in preds:
        pruned = (g["smx"] < plo) | (g["smn"] > phi)
        full = (~pruned) & (g["smn"] >= plo) & (g["smx"] <= phi)
        straddle = ~(pruned | full)
        scanned = int(g.loc[~pruned, "n"].sum())
        matched = int(g["m_" + name].sum())
        rows.append((name, plo, phi, len(g), int(pruned.sum()),
                     int(full.sum()), int(straddle.sum()), scanned,
                     matched,
                     1000 * scanned // matched if matched > 0 else -1))
    return pd.DataFrame(rows, columns=[
        "pred", "plo", "phi", "n_segments", "n_pruned", "n_full",
        "n_straddle", "rows_scanned", "rows_match",
        "scan_amp_milli"]).astype(
        {c: "int64" for c in ("plo", "phi", "n_segments", "n_pruned",
                              "n_full", "n_straddle", "rows_scanned",
                              "rows_match", "scan_amp_milli")})


def events_sax_motifs(sf_dir: str) -> pd.DataFrame:
    """SAX MOTIF census of the daily event-count series — symbolic
    discretization into a 3-letter alphabet at the EXACT tercile
    breakpoints (nearest-rank order statistics k = ceil(n/3) and
    ceil(2n/3), so both sides cut on the identical integer values)
    followed by a 3-day sliding-word count: the top-10 words under
    the (count desc, word asc) total order are the recurring weekly
    micro-shapes ('aab' = two quiet days then a spike) that motif
    discovery at 100 TB would index. Daily partials collapse the
    stream per block — ZERO shuffle; the word sweep runs on the
    calendar-sized vector. Pure integers, shares in exact bps."""
    ds = _read(sf_dir, "events", columns=["ts"])

    def partial(t: pa.Table) -> pa.Table:
        d = t.column("ts").cast(pa.int64()).to_numpy() // _DAY_US
        u, cnt = np.unique(d, return_counts=True)
        return pa.table({"dy": pa.array(u),
                         "c": pa.array(cnt.astype(np.int64))})

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    agg = (parts.groupby("dy", as_index=False)["c"].sum()
           .sort_values("dy", kind="mergesort"))
    c = agg["c"].to_numpy(np.int64)
    n = len(c)
    srt = np.sort(c)
    b1 = int(srt[(n + 2) // 3 - 1])
    b2 = int(srt[(2 * n + 2) // 3 - 1])
    sym = np.where(c <= b1, 0, np.where(c <= b2, 1, 2)).astype(np.int64)
    w = sym[:-2] * 9 + sym[1:-1] * 3 + sym[2:]
    cnt = np.bincount(w, minlength=27).astype(np.int64)
    tot = n - 2
    words = ["".join(chr(97 + d) for d in (k // 9, (k // 3) % 3, k % 3))
             for k in range(27)]
    df = pd.DataFrame({"word": words, "n": cnt})
    df = df[df["n"] > 0].sort_values(
        ["n", "word"], ascending=[False, True], kind="mergesort") \
        .head(10).reset_index(drop=True)
    df["share_bps"] = 10000 * df["n"].to_numpy(np.int64) // tot
    return df.astype({"n": "int64", "share_bps": "int64"})


def lineitem_bucket_semijoin_audit(sf_dir: str) -> pd.DataFrame:
    """HASH-BUCKET SEMIJOIN pruning audit — completes the layout trio
    (zone maps, space-filling curves, hash buckets): if lineitem were
    bucketed by l_partkey % G, how many buckets would a semijoin
    against the top-100 revenue parts (the exact (rev desc, partkey)
    order) actually touch, and at what scan amplification? ONE scan:
    the per-part (rows, revenue-cents) fold is part-cardinality-sized
    on the driver, and every grain G in {64, 256, 1024} is then pure
    driver arithmetic over that table — hot buckets = distinct
    h % G, rows_scanned = rows of parts sharing a hot bucket,
    amp_milli = 1000*scanned//matched. Pure integers; the
    bucket-count-vs-amplification curve is the 100 TB co-location
    design table."""
    ds = _read(sf_dir, "lineitem",
               columns=["l_partkey", "l_extendedprice", "l_discount"])

    def partial(t: pa.Table) -> pa.Table:
        pk = t.column("l_partkey").to_numpy().astype(np.int64)
        rev = np.floor(t.column("l_extendedprice").to_numpy()
                       * (1 - t.column("l_discount").to_numpy())
                       * 100).astype(np.int64)
        u, inv = np.unique(pk, return_inverse=True)
        return pa.table({
            "pk": pa.array(u),
            "n": pa.array(np.bincount(inv, minlength=len(u))
                          .astype(np.int64)),
            "rev": pa.array(np.bincount(inv, weights=rev,
                                        minlength=len(u))
                            .astype(np.int64))})

    pr = (ds.map_batches(partial, batch_format="pyarrow")
          .to_pandas().groupby("pk", as_index=False).sum())
    pk = pr["pk"].to_numpy(np.int64)
    n = pr["n"].to_numpy(np.int64)
    order = np.lexsort((pk, -pr["rev"].to_numpy(np.int64)))
    hot = pk[order[:100]]
    matched = int(n[order[:100]].sum())
    total = int(n.sum())
    rows = []
    for g in (64, 256, 1024):
        hb = np.unique(hot % g)
        scanned = int(n[np.isin(pk % g, hb)].sum())
        rows.append((g, len(hb), scanned, matched,
                     1000 * scanned // matched, total))
    return pd.DataFrame(rows, columns=[
        "grain", "n_hot_buckets", "rows_scanned", "rows_match",
        "amp_milli", "total_rows"]).astype("int64")


def events_recurrence_quantification(sf_dir: str) -> pd.DataFrame:
    """RECURRENCE QUANTIFICATION (RQA) of the gapfilled daily
    event-count series — the nonlinear-dynamics census: a day pair
    (i < j) RECURS when |x_i - x_j| <= eps with the integer radius
    eps = (max-min)//20, the recurrence rate is the share of
    recurrent pairs in bps, and DETERMINISM is the share of recurrent
    pairs that sit on a diagonal line (the (i+1, j+1) pair also
    recurs — trajectories that stay parallel, the signature of
    deterministic structure vs isolated coincidence). The O(n^2) pair
    sweep runs on the calendar-bounded grid, never on rows (the same
    budget as the Mann-Kendall pair sweep); daily partials collapse
    the stream — ZERO shuffle. Pure integers end to end."""
    ds = _read(sf_dir, "events", columns=["ts"])

    def partial(t: pa.Table) -> pa.Table:
        d = t.column("ts").cast(pa.int64()).to_numpy() // _DAY_US
        u, cnt = np.unique(d, return_counts=True)
        return pa.table({"dy": pa.array(u),
                         "c": pa.array(cnt.astype(np.int64))})

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    agg = parts.groupby("dy", as_index=False)["c"].sum()
    days = agg["dy"].to_numpy(np.int64)
    lo, hi = int(days.min()), int(days.max())
    x = np.zeros(hi - lo + 1, dtype=np.int64)
    x[days - lo] = agg["c"].to_numpy(np.int64)
    n = len(x)
    eps = (int(x.max()) - int(x.min())) // 20
    i, j = np.triu_indices(n, k=1)
    rec = np.abs(x[i] - x[j]) <= eps
    n_pairs = len(i)
    n_rec = int(rec.sum())
    # diagonal persistence: both (i,j) and (i+1,j+1) recurrent
    keep = j < n - 1
    nxt = np.zeros(len(i), dtype=bool)
    # (i+1, j+1) recurrence computed directly from the value vector
    nxt[keep] = np.abs(x[i[keep] + 1] - x[j[keep] + 1]) <= eps
    n_det = int((rec & nxt).sum())
    return pd.DataFrame([(n, eps, n_pairs, n_rec,
                          10000 * n_rec // n_pairs, n_det,
                          10000 * n_det // n_rec if n_rec else -1)],
                        columns=["n_days", "eps", "n_pairs", "n_rec",
                                 "rr_bps", "n_det", "det_bps"]) \
        .astype("int64")


def orders_bullwhip_ratio(sf_dir: str) -> pd.DataFrame:
    """BULLWHIP variance-amplification audit — does the shipment
    stream (lineitems shipped per day) swing HARDER than the demand
    stream that drives it (orders placed per day)? The supply-chain
    instability number, exact end to end: each stream's variance
    stays the cleared rational (n*sum(x^2) - S^2) / n^2 and the
    amplification ratio closes fully cross-multiplied as
    1000 * (nD*SSD - SD^2) * nU^2 // ((nU*SSU - SU^2) * nD^2) — no
    rational mean, no float, Python bigints here / HUGEINT in the
    twin. Two independent daily-count folds over their own gapfilled
    calendars, ZERO shuffle and ZERO joins."""
    def daily_var(table: str, col: str):
        ds = _read(sf_dir, table, columns=[col])

        def partial(t: pa.Table) -> pa.Table:
            d = t.column(col).cast(pa.int64()).to_numpy() // _DAY_US
            u, cnt = np.unique(d, return_counts=True)
            return pa.table({"dy": pa.array(u),
                             "c": pa.array(cnt.astype(np.int64))})

        parts = ds.map_batches(partial, batch_format="pyarrow") \
            .to_pandas()
        agg = parts.groupby("dy", as_index=False)["c"].sum()
        days = agg["dy"].to_numpy(np.int64)
        lo, hi = int(days.min()), int(days.max())
        vec = np.zeros(hi - lo + 1, dtype=np.int64)
        vec[days - lo] = agg["c"].to_numpy(np.int64)
        n = len(vec)
        s = int(vec.sum())
        ss = int((vec * vec).sum())
        return n, s, n * ss - s * s

    nu, su, vu = daily_var("orders", "o_orderdate")
    nd, sd, vd = daily_var("lineitem", "l_shipdate")
    ratio_milli = 1000 * vd * nu * nu // (vu * nd * nd)
    return pd.DataFrame([(nu, su, vu, nd, sd, vd, ratio_milli)],
                        columns=["n_days_up", "n_orders", "var_num_up",
                                 "n_days_down", "n_ships",
                                 "var_num_down", "ratio_milli"]) \
        .astype("int64")


def user_split_half_reliability(sf_dir: str) -> pd.DataFrame:
    """SPLIT-HALF RELIABILITY of the per-user activity measure — the
    psychometric "is one half of the data enough to rank users"
    check: each user's event count splits by DAY PARITY into
    (odd-days, even-days) halves, the Pearson r between the halves
    comes from six exact integer moments (no rational mean), and the
    Spearman-Brown full-length projection 2r/(1+r) closes in the SAME
    IEEE float order as the twin (one CAST-divide-sqrt chain, both
    floored to milli). ONE user-bucket exchange; each bucket folds
    its users to a single 6-moment partial row, so the driver sums
    bucket-cardinality rows. High r = half the data ranks users the
    same; low r = per-user metrics need the full window."""
    import math

    ds = _read(sf_dir, "events", columns=["user_id", "ts"])

    def derive(t: pa.Table) -> pa.Table:
        u = t.column("user_id").to_numpy().astype(np.int64)
        d = t.column("ts").cast(pa.int64()).to_numpy() // _DAY_US
        return pa.table({
            "u": pa.array(u),
            "par": pa.array((d % 2).astype(np.int64)),
            "bucket": pa.array((u % 64).astype(np.int32))})

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        u = g["u"].to_numpy(np.int64)
        par = g["par"].to_numpy(np.int64)
        uu, inv = np.unique(u, return_inverse=True)
        k = len(uu)
        co = np.bincount(inv, weights=par, minlength=k) \
            .astype(np.int64)
        ce = np.bincount(inv, minlength=k).astype(np.int64) - co
        return pd.DataFrame([{
            "n": k, "sx": int(co.sum()), "sy": int(ce.sum()),
            "sxx": int((co * co).sum()), "syy": int((ce * ce).sum()),
            "sxy": int((co * ce).sum())}])

    m = (ds.map_batches(derive, batch_format="pyarrow")
         .groupby("bucket").map_groups(fold, batch_format="pandas")
         .to_pandas().sum())
    n, sx, sy = int(m["n"]), int(m["sx"]), int(m["sy"])
    sxx, syy, sxy = int(m["sxx"]), int(m["syy"]), int(m["sxy"])
    num = n * sxy - sx * sy
    va = n * sxx - sx * sx
    vb = n * syy - sy * sy
    if va > 0 and vb > 0:
        rf = float(num) / (math.sqrt(float(va)) * math.sqrt(float(vb)))
        r_milli = math.floor(rf * 1000.0)
        sb_milli = math.floor(2.0 * rf / (1.0 + rf) * 1000.0)
    else:
        r_milli, sb_milli = 0, 0
    return pd.DataFrame([(n, num, va, vb, r_milli, sb_milli)],
                        columns=["n_users", "cov_num", "var_odd",
                                 "var_even", "r_milli", "sb_milli"]) \
        .astype("int64")


def events_peak_over_threshold(sf_dir: str) -> pd.DataFrame:
    """PEAKS-OVER-THRESHOLD census of the gapfilled daily count
    series — the extreme-value-theory intake: at the exact
    nearest-rank p90/p95/p99 thresholds u (ceil-rank order statistics
    so both sides cut on identical integers), report exceedances
    (x > u strictly), DECLUSTERED event count (runs of consecutive
    exceed days collapse to one cluster — the gaps-and-islands
    i - row_number key), total and mean excess (one integer milli
    floor) and the max excess — the mean-excess ladder is the GPD
    tail-heaviness diagnostic. Daily partials collapse the stream —
    ZERO shuffle; the threshold sweep runs on the calendar-sized
    vector. Pure integers end to end."""
    ds = _read(sf_dir, "events", columns=["ts"])

    def partial(t: pa.Table) -> pa.Table:
        d = t.column("ts").cast(pa.int64()).to_numpy() // _DAY_US
        u, cnt = np.unique(d, return_counts=True)
        return pa.table({"dy": pa.array(u),
                         "c": pa.array(cnt.astype(np.int64))})

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    agg = parts.groupby("dy", as_index=False)["c"].sum()
    days = agg["dy"].to_numpy(np.int64)
    lo, hi = int(days.min()), int(days.max())
    x = np.zeros(hi - lo + 1, dtype=np.int64)
    x[days - lo] = agg["c"].to_numpy(np.int64)
    n = len(x)
    srt = np.sort(x)
    rows = []
    for q in (90, 95, 99):
        u = int(srt[(q * n + 99) // 100 - 1])
        m = x > u
        n_exc = int(m.sum())
        if n_exc == 0:
            rows.append((q, u, 0, 0, 0, -1, -1))
            continue
        starts = int((m & ~np.concatenate(([False], m[:-1]))).sum())
        exc = x[m] - u
        rows.append((q, u, n_exc, starts, int(exc.sum()),
                     1000 * int(exc.sum()) // n_exc, int(exc.max())))
    return pd.DataFrame(rows, columns=[
        "q", "u", "n_exceed", "n_clusters", "sum_excess",
        "mean_excess_milli", "max_excess"]).astype("int64")


def embedding_centroid_drift(sf_dir: str) -> pd.DataFrame:
    """CENTROID DRIFT monitor — for every label, the cosine between
    the even-vec_id half's centroid and the odd half's (the
    refresh-stability audit: a healthy class reads ~1000 milli, a
    drifting or heterogeneous one sags). Scale-invariance makes the
    centroid division unnecessary: cos(mean0, mean1) = cos(sum0,
    sum1), so the op needs only per-(label, half) DIM-SUM vectors of
    the exact 1e-6 fixed-point coordinates (the same packed
    all-reduce partial as ``embedding_label_centroids``, ZERO
    shuffle) and ONE IEEE-order-matched float chain per label at the
    very end. Arrow list values flatten zero-copy."""
    import math

    ds = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet",
                               columns=["vec_id", "embedding", "label"])

    def partial(t: pa.Table) -> pa.Table:
        arr = t.column("embedding").combine_chunks()
        flat = arr.flatten().to_numpy(zero_copy_only=False)
        lab = t.column("label").to_numpy().astype(np.int64)
        half = t.column("vec_id").to_numpy().astype(np.int64) % 2
        dim = len(flat) // len(arr)
        fp = np.floor(flat.astype(np.float64) * 1_000_000.0) \
            .astype(np.int64).reshape(-1, dim)
        key = lab * 2 + half
        ks, o_n, o_s = [], [], []
        for k in np.unique(key):
            m = key == k
            ks.append(int(k))
            o_n.append(int(m.sum()))
            o_s.append(fp[m].sum(axis=0).tobytes())
        return pa.table({
            "k": pa.array(ks, type=pa.int64()),
            "n": pa.array(o_n, type=pa.int64()),
            "s": pa.array(o_s, type=pa.large_binary())})

    rows = ds.map_batches(partial, batch_format="pyarrow").take_all()
    acc: dict[int, list] = {}
    for r in rows:
        s = np.frombuffer(r["s"], dtype=np.int64)
        if r["k"] in acc:
            acc[r["k"]][0] += int(r["n"])
            acc[r["k"]][1] = acc[r["k"]][1] + s
        else:
            acc[r["k"]] = [int(r["n"]), s.copy()]
    out = []
    for lb in sorted({k // 2 for k in acc}):
        n0, s0 = acc.get(lb * 2, [0, None])
        n1, s1 = acc.get(lb * 2 + 1, [0, None])
        if not n0 or not n1:
            out.append((lb, n0, n1, -2000))
            continue
        num = sum(int(a) * int(b) for a, b in zip(s0, s1))
        d0 = sum(int(a) * int(a) for a in s0)
        d1 = sum(int(b) * int(b) for b in s1)
        cm = math.floor(float(num)
                        / (math.sqrt(float(d0)) * math.sqrt(float(d1)))
                        * 1000.0)
        out.append((lb, n0, n1, cm))
    return pd.DataFrame(out, columns=["label", "n_even", "n_odd",
                                      "cos_milli"]).astype("int64")


def orders_epoch_folding(sf_dir: str) -> pd.DataFrame:
    """EPOCH-FOLDING period scan of the daily order-count series —
    the chi-square complement to the DFT periodogram (it finds
    NON-SINUSOIDAL periodicity too): for each candidate period p in
    {5,6,7,8,30}, the grid truncates to complete cycles
    n0 = (n//p)*p so every phase bin covers the same number of days,
    the bins fold as O_k = sum of counts at phase k, and the uniform
    fit closes EXACTLY as chi2_milli = 1000*sum((p*O_k - T0)^2) //
    (p*T0) — the cleared-expectation identity, no rational mean. The
    peak phase resolves under the (count desc, phase asc) rule.
    Daily partials — ZERO shuffle; the fold runs on the
    calendar-sized vector. Pure integers end to end."""
    ds = _read(sf_dir, "orders", columns=["o_orderdate"])

    def partial(t: pa.Table) -> pa.Table:
        d = t.column("o_orderdate").cast(pa.int64()).to_numpy() \
            // _DAY_US
        u, cnt = np.unique(d, return_counts=True)
        return pa.table({"dy": pa.array(u),
                         "c": pa.array(cnt.astype(np.int64))})

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    agg = parts.groupby("dy", as_index=False)["c"].sum()
    days = agg["dy"].to_numpy(np.int64)
    lo, hi = int(days.min()), int(days.max())
    x = np.zeros(hi - lo + 1, dtype=np.int64)
    x[days - lo] = agg["c"].to_numpy(np.int64)
    n = len(x)
    rows = []
    for p in (5, 6, 7, 8, 30):
        n0 = (n // p) * p
        o = x[:n0].reshape(-1, p).sum(axis=0)
        t0 = int(o.sum())
        num = int(((p * o - t0) ** 2).sum())
        peak = int(np.argmax(o))
        rows.append((p, n0, t0, 1000 * num // (p * t0), p - 1, peak,
                     10000 * int(o[peak]) // t0))
    return pd.DataFrame(rows, columns=[
        "p", "n_days_used", "total", "chi2_milli", "df", "peak_k",
        "peak_share_bps"]).astype("int64")


def part_demand_quadrants(sf_dir: str) -> pd.DataFrame:
    """SYNTETOS-BOYLAN demand-pattern census — every part classified
    smooth / erratic / intermittent / lumpy (plus the single-demand
    bucket) from its demand-day series: ADI = (last-first)/(k-1)
    demand-day spacing and CV^2 = (k*sum(q^2)-S^2)/S^2 of the per-day
    demand sizes, with BOTH classic cutoffs (1.32, 0.49) applied as
    cross-multiplied integer compares 100*(dl-df) >= 132*(k-1) and
    100*(k*sq-S^2) >= 49*S^2 — no rational ever formed. The
    forecasting-method router for 100 TB inventory streams. One
    ``pk % 64`` exchange co-locates each part's (day, qty) rows;
    block-level (part, day) pre-aggregation bounds the exchange; the
    driver folds a 5-row census. Pure integers end to end."""
    ds = _read(sf_dir, "lineitem",
               columns=["l_partkey", "l_shipdate", "l_quantity"])

    def derive(t: pa.Table) -> pa.Table:
        pk = t.column("l_partkey").to_numpy().astype(np.int64)
        d = t.column("l_shipdate").cast(pa.int64()).to_numpy() \
            // 86_400_000_000
        q = np.floor(t.column("l_quantity").to_numpy()).astype(np.int64)
        key = pk * 32768 + d
        u, inv = np.unique(key, return_inverse=True)
        return pa.table({
            "pk": pa.array(u // 32768),
            "d": pa.array(u % 32768),
            "q": pa.array(np.bincount(inv, weights=q,
                                      minlength=len(u))
                          .astype(np.int64)),
            "bucket": pa.array(((u // 32768) % 64).astype(np.int32))})

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        key = g["pk"].to_numpy(np.int64) * 32768 \
            + g["d"].to_numpy(np.int64)
        u, inv = np.unique(key, return_inverse=True)
        q = np.bincount(inv, weights=g["q"].to_numpy(np.int64),
                        minlength=len(u)).astype(np.int64)
        pk = u // 32768
        d = u % 32768
        pu, pinv = np.unique(pk, return_inverse=True)
        k = np.bincount(pinv, minlength=len(pu)).astype(np.int64)
        s = np.bincount(pinv, weights=q, minlength=len(pu)) \
            .astype(np.int64)
        sq = np.bincount(pinv, weights=q * q, minlength=len(pu)) \
            .astype(np.int64)
        df = np.full(len(pu), np.iinfo(np.int64).max, np.int64)
        np.minimum.at(df, pinv, d)
        dl = np.zeros(len(pu), np.int64)
        np.maximum.at(dl, pinv, d)
        return pd.DataFrame({"pk": pu, "k": k, "s": s, "sq": sq,
                             "df": df, "dl": dl})

    per = (ds.map_batches(derive, batch_format="pyarrow")
           .groupby("bucket").map_groups(fold, batch_format="pandas")
           .to_pandas())
    k = per["k"].to_numpy(np.int64)
    s = per["s"].to_numpy(np.int64)
    sq = per["sq"].to_numpy(np.int64)
    span = per["dl"].to_numpy(np.int64) - per["df"].to_numpy(np.int64)
    adi_hi = 100 * span >= 132 * (k - 1)
    cv_hi = 100 * (k * sq - s * s) >= 49 * s * s
    quad = np.where(k == 1, "single",
                    np.where(adi_hi,
                             np.where(cv_hi, "lumpy", "intermittent"),
                             np.where(cv_hi, "erratic", "smooth")))
    dfq = pd.DataFrame({"quadrant": quad, "k": k, "s": s})
    g = dfq.groupby("quadrant", as_index=False).agg(
        n_parts=("k", "size"), sum_demand_days=("k", "sum"),
        sum_qty=("s", "sum"))
    g["share_bps"] = 10000 * g["n_parts"].to_numpy(np.int64) \
        // len(per)
    return (g[["quadrant", "n_parts", "share_bps",
               "sum_demand_days", "sum_qty"]]
            .sort_values("quadrant", kind="mergesort")
            .reset_index(drop=True)
            .astype({c: "int64" for c in ("n_parts", "share_bps",
                                          "sum_demand_days",
                                          "sum_qty")}))


def customer_lorenz_asymmetry(sf_dir: str) -> pd.DataFrame:
    """LORENZ ASYMMETRY coefficient of per-customer revenue — the
    shape statistic Gini cannot see (WHICH side of the mean carries
    the inequality): S = F(mu) + L(mu), evaluated with the strict
    cross-multiplied below-mean test n*x < T (no rational mean ever
    formed) and closed as the documented sum of two integer milli
    floors 1000*m//n + 1000*L//T; S < 1000 means inequality comes
    from a few giants, S > 1000 from many minnows. Equal-to-mean
    customers are counted separately. Per-block customer partials
    fold driver-side at customer cardinality. Pure integers."""
    ds = _read(sf_dir, "orders", columns=["o_custkey", "o_totalprice"])

    def partial(t: pa.Table) -> pa.Table:
        c = t.column("o_custkey").to_numpy().astype(np.int64)
        cents = np.floor(t.column("o_totalprice").to_numpy() * 100) \
            .astype(np.int64)
        u, inv = np.unique(c, return_inverse=True)
        return pa.table({
            "ck": pa.array(u),
            "x": pa.array(np.bincount(inv, weights=cents,
                                      minlength=len(u))
                          .astype(np.int64))})

    per = (ds.map_batches(partial, batch_format="pyarrow")
           .to_pandas().groupby("ck", as_index=False).sum())
    x = per["x"].to_numpy(np.int64)
    n = len(x)
    t = int(x.sum())
    below = n * x < t
    m = int(below.sum())
    lm = int(x[below].sum())
    e = int((n * x == t).sum())
    lac_milli = 1000 * m // n + 1000 * lm // t
    return pd.DataFrame([(n, t, m, e, lm, lac_milli)],
                        columns=["n_customers", "total_cents",
                                 "n_below", "n_at_mean", "below_cents",
                                 "lac_milli"]).astype("int64")


def customer_order_overdispersion(sf_dir: str) -> pd.DataFrame:
    """OVERDISPERSION census of per-customer order counts — is demand
    Poisson (memoryless customers) or negative-binomial (heavy repeat
    buyers)? The index of contagion ICS = Var/Mean - 1 stays exact
    via the cleared form 1000*(n*sum(c^2) - S^2) // (n*S) - 1000, and
    the negative-binomial size parameter closes as the method-of-
    moments k = Mean^2/(Var - Mean) = S^2/(n*sum(c^2) - S^2 - n*S) —
    one sign-gated integer milli division (underdispersed data
    reports the -1 sentinel). Per-block customer-count partials fold
    driver-side at customer cardinality. Pure integers, the
    NB-vs-Poisson router for demand modeling."""
    ds = _read(sf_dir, "orders", columns=["o_custkey"])

    def partial(t: pa.Table) -> pa.Table:
        c = t.column("o_custkey").to_numpy().astype(np.int64)
        u, cnt = np.unique(c, return_counts=True)
        return pa.table({"ck": pa.array(u),
                         "c": pa.array(cnt.astype(np.int64))})

    per = (ds.map_batches(partial, batch_format="pyarrow")
           .to_pandas().groupby("ck", as_index=False).sum())
    c = per["c"].to_numpy(np.int64)
    n = len(c)
    s = int(c.sum())
    s2 = int((c * c).sum())
    d = n * s2 - s * s
    ics_milli = 1000 * d // (n * s) - 1000
    den_k = d - n * s
    nb_k_milli = 1000 * s * s // den_k if den_k > 0 else -1
    return pd.DataFrame([(n, s, s2, d, ics_milli, nb_k_milli)],
                        columns=["n_customers", "sum_orders",
                                 "sum_sq", "disp_num", "ics_milli",
                                 "nb_k_milli"]).astype("int64")


def nation_segment_rca(sf_dir: str) -> pd.DataFrame:
    """REVEALED COMPARATIVE ADVANTAGE grid — Balassa's index per
    (customer nation, market segment) on order revenue: rca_milli =
    1000 * x_ns * x_total // (x_n * x_s), fully cross-multiplied in
    Python bigints / HUGEINT so no share rational is ever formed;
    >1000 = the nation over-indexes in that segment. The customer
    dimension broadcasts as a custkey -> (nation, segment) lookup
    (``ray.put`` once, read per task — never a shuffle join); each
    block emits one 25x5 revenue-cents grid partial — ZERO row
    shuffle; the index closes on the driver grid. The
    market-structure screen a pricing team reads before entering a
    lane."""
    cust = _read(sf_dir, "customer",
                 columns=["c_custkey", "c_nationkey", "c_mktsegment"]) \
        .to_pandas()
    segs, seg_uniq = pd.factorize(cust["c_mktsegment"], sort=True)
    mx = int(cust["c_custkey"].max())
    natlut = np.full(mx + 1, -1, np.int64)
    seglut = np.full(mx + 1, -1, np.int64)
    ck = cust["c_custkey"].to_numpy(np.int64)
    natlut[ck] = cust["c_nationkey"].to_numpy(np.int64)
    seglut[ck] = segs
    nseg = len(seg_uniq)
    lut_ref = ray.put((natlut, seglut))

    ds = _read(sf_dir, "orders", columns=["o_custkey", "o_totalprice"])

    def partial(t: pa.Table) -> pa.Table:
        nl, sl = ray.get(lut_ref)
        ck = t.column("o_custkey").to_numpy().astype(np.int64)
        cents = np.floor(t.column("o_totalprice").to_numpy() * 100) \
            .astype(np.int64)
        key = nl[ck] * nseg + sl[ck]
        u, inv = np.unique(key, return_inverse=True)
        return pa.table({
            "key": pa.array(u),
            "x": pa.array(np.bincount(inv, weights=cents,
                                      minlength=len(u))
                          .astype(np.int64))})

    g = (ds.map_batches(partial, batch_format="pyarrow")
         .to_pandas().groupby("key", as_index=False).sum())
    key = g["key"].to_numpy(np.int64)
    x = g["x"].to_numpy(np.int64)
    nk = key // nseg
    sg = key % nseg
    rx = {int(k): int(v) for k, v in
          pd.Series(x).groupby(nk).sum().items()}
    cx = {int(k): int(v) for k, v in
          pd.Series(x).groupby(sg).sum().items()}
    tx = int(x.sum())
    rows = []
    for i in np.lexsort((sg, nk)):
        xi = int(x[i])
        rows.append((int(nk[i]), str(seg_uniq[sg[i]]), xi,
                     rx[int(nk[i])], cx[int(sg[i])],
                     1000 * xi * tx // (rx[int(nk[i])]
                                        * cx[int(sg[i])])))
    return pd.DataFrame(rows, columns=[
        "c_nationkey", "c_mktsegment", "cents", "nation_cents",
        "segment_cents", "rca_milli"]).astype(
        {c: "int64" for c in ("c_nationkey", "cents", "nation_cents",
                              "segment_cents", "rca_milli")})


def part_price_stickiness(sf_dir: str) -> pd.DataFrame:
    """PRICE STICKINESS census — how often does a part's UNIT price
    actually move between consecutive sales? Consecutive lineitems of
    the same part under the total (shipdate, orderkey, linenumber)
    order compare unit prices EXACTLY via the cross-multiplied
    ep1*q2 != ep2*q1 test (no division, no float, quantity-mix
    immune). One ``pk % 64`` exchange co-locates each part's history;
    the in-bucket pairing is one lexsort + same-part mask; the driver
    folds four integers. The menu-cost / repricing-cadence number a
    pricing team tracks."""
    ds = _read(sf_dir, "lineitem",
               columns=["l_partkey", "l_shipdate", "l_orderkey",
                        "l_linenumber", "l_extendedprice",
                        "l_quantity"])

    def derive(t: pa.Table) -> pa.Table:
        pk = t.column("l_partkey").to_numpy().astype(np.int64)
        return pa.table({
            "pk": pa.array(pk),
            "d": t.column("l_shipdate").cast(pa.int64()),
            "ok": t.column("l_orderkey"),
            "ln": t.column("l_linenumber"),
            "ep": pa.array(np.floor(
                t.column("l_extendedprice").to_numpy() * 100)
                .astype(np.int64)),
            "q": pa.array(np.floor(
                t.column("l_quantity").to_numpy()).astype(np.int64)),
            "bucket": pa.array((pk % 64).astype(np.int32))})

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        pk = g["pk"].to_numpy(np.int64)
        d = g["d"].to_numpy(np.int64)
        ok = g["ok"].to_numpy(np.int64)
        ln = g["ln"].to_numpy(np.int64)
        ep = g["ep"].to_numpy(np.int64)
        q = g["q"].to_numpy(np.int64)
        order = np.lexsort((ln, ok, d, pk))
        pk, ep, q = pk[order], ep[order], q[order]
        same = np.empty(len(pk), dtype=bool)
        same[0] = False
        same[1:] = pk[1:] == pk[:-1]
        i = np.flatnonzero(same)
        ch = ep[i] * q[i - 1] != ep[i - 1] * q[i]
        return pd.DataFrame([{
            "n_parts_multi": int(len(np.unique(pk[i]))),
            "n_pairs": int(len(i)), "n_changed": int(ch.sum())}])

    m = (ds.map_batches(derive, batch_format="pyarrow")
         .groupby("bucket").map_groups(fold, batch_format="pandas")
         .to_pandas().sum())
    n_pairs = int(m["n_pairs"])
    return pd.DataFrame([(int(m["n_parts_multi"]), n_pairs,
                          int(m["n_changed"]),
                          10000 * int(m["n_changed"]) // n_pairs)],
                        columns=["n_parts_multi", "n_pairs",
                                 "n_changed", "changed_bps"]) \
        .astype("int64")


def embedding_kmeans_elbow(sf_dir: str) -> pd.DataFrame:
    """K-MEANS ELBOW audit — exact inertia of the seed assignment at
    k = 2/4/8 (the model-selection curve read before committing a
    clustering budget): centroids are the vectors with the 8 SMALLEST
    vec_ids (found by a distributed min-k partial, then a filtered
    collect of just those 8 rows — never a full pull), coordinates
    quantize to exact 1e-6 fixed point, and because the seed sets
    nest, ONE pass computes all eight distances per vector and every
    k's min reduces from the same matrix (ties break to the smallest
    centroid id). Inertia accumulates in Python ints (HUGEINT in the
    twin) and reports // 10^6 so the column stays int64 at any SF.
    Per-block (inertia, cluster-count) partials — ZERO shuffle."""
    ds = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet",
                               columns=["vec_id", "embedding"])

    def min_ids(t: pa.Table) -> pa.Table:
        v = np.sort(t.column("vec_id").to_numpy().astype(np.int64))
        return pa.table({"vec_id": pa.array(v[:8])})

    mins = ds.map_batches(min_ids, batch_format="pyarrow").to_pandas()
    seed_ids = np.sort(mins["vec_id"].to_numpy(np.int64))[:8]
    sid_ref = ray.put(seed_ids)

    def pick(t: pa.Table) -> pa.Table:
        sids = ray.get(sid_ref)
        v = t.column("vec_id").to_numpy().astype(np.int64)
        return t.filter(pa.array(np.isin(v, sids)))

    sp = ds.map_batches(pick, batch_format="pyarrow").to_pandas() \
        .sort_values("vec_id")
    cents = np.stack([np.floor(np.asarray(e, dtype=np.float64)
                               * 1_000_000.0).astype(np.int64)
                      for e in sp["embedding"]])
    c_ref = ray.put(cents)

    def partial(t: pa.Table) -> pa.Table:
        cm = ray.get(c_ref)
        arr = t.column("embedding").combine_chunks()
        flat = arr.flatten().to_numpy(zero_copy_only=False)
        dim = len(flat) // len(arr)
        fp = np.floor(flat.astype(np.float64) * 1_000_000.0) \
            .astype(np.int64).reshape(-1, dim)
        d2 = np.stack([((fp - cm[j]) ** 2).sum(axis=1)
                       for j in range(len(cm))], axis=1)
        rows = []
        for k in (2, 4, 8):
            sub = d2[:, :k]
            a = np.argmin(sub, axis=1)      # first min = smallest cid
            inert = int(sub[np.arange(len(sub)), a].sum())
            cnt = np.bincount(a, minlength=k).astype(np.int64)
            rows.append((k, inert, cnt.tobytes(), len(sub)))
        return pa.table({
            "k": pa.array([r[0] for r in rows], type=pa.int64()),
            "inert": pa.array([r[1] for r in rows], type=pa.int64()),
            "cnt": pa.array([r[2] for r in rows],
                            type=pa.large_binary()),
            "n": pa.array([r[3] for r in rows], type=pa.int64())})

    raw = ds.map_batches(partial, batch_format="pyarrow").take_all()
    out = []
    for k in (2, 4, 8):
        tot = 0
        n = 0
        cnt = np.zeros(k, dtype=np.int64)
        for r in raw:
            if r["k"] != k:
                continue
            tot += int(r["inert"])
            n += int(r["n"])
            cnt = cnt + np.frombuffer(r["cnt"], dtype=np.int64)
        out.append((k, n, tot // 1_000_000, int(cnt.max())))
    return pd.DataFrame(out, columns=["k", "n_vecs", "inertia_scaled",
                                      "biggest_n"]).astype("int64")


def orders_quarterly_gini(sf_dir: str) -> pd.DataFrame:
    """INEQUALITY DRIFT — exact Gini of the daily revenue
    distribution per calendar QUARTER (90-day windows from the span
    start): is revenue concentrating into fewer days over time? The
    pairwise-|difference| sum folds by the sorted-rank identity
    sum((2r - n - 1) * x) — O(n log n), tie-permutation invariant
    because a tie group's coefficient-sum is fixed regardless of
    which rank each equal value takes — and Gini closes as ONE
    integer bps floor 10000*S // (n*T) per quarter. Daily cents
    partials collapse the stream — ZERO shuffle; quarters are
    calendar-bounded."""
    ds = _read(sf_dir, "orders", columns=["o_orderdate", "o_totalprice"])

    def partial(t: pa.Table) -> pa.Table:
        dy = t.column("o_orderdate").cast(pa.int64()).to_numpy() \
            // 86_400_000_000
        rev = np.floor(t.column("o_totalprice").to_numpy() * 100) \
            .astype(np.int64)
        u, inv = np.unique(dy, return_inverse=True)
        return pa.table({
            "dy": pa.array(u),
            "cents": pa.array(np.bincount(inv, weights=rev,
                                          minlength=len(u))
                              .astype(np.int64))})

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    agg = parts.groupby("dy", as_index=False)["cents"].sum()
    days = agg["dy"].to_numpy(np.int64)
    lo = int(days.min())
    q = (days - lo) // 90
    cents = agg["cents"].to_numpy(np.int64)
    rows = []
    for qi in np.unique(q):
        x = np.sort(cents[q == qi])
        n = len(x)
        t = int(x.sum())
        s = int(((2 * np.arange(1, n + 1, dtype=np.int64) - n - 1)
                 * x).sum())
        rows.append((int(qi), n, t,
                     10000 * s // (n * t) if n > 0 and t > 0 else -1))
    return pd.DataFrame(rows, columns=["quarter", "n_days",
                                       "total_cents", "gini_bps"]) \
        .astype("int64")


def part_price_nested_anova(sf_dir: str) -> pd.DataFrame:
    """NESTED (hierarchical) ANOVA of part retail price — brand
    WITHIN type: how much price variation lives between types,
    between brands inside a type, and within cells? The design the
    crossed two-way can't express (brands aren't comparable across
    types). The exact integer discipline of ``orders_dow_anova``
    carries over level by level: every mean floors once to
    milli-cents, SS_type = sum n_t*(m_t-m)^2, SS_brand(type) =
    sum n_tb*(m_tb-m_t)^2, SS_within by the expanded-square identity
    1e6*Q - 2*m*1000*S + n*m^2 — all Python-bigint/HUGEINT, the
    nested F_type = MS_type/MS_brand rule, NO float anywhere. SS
    outputs report // 10^6 to stay int64. One (type, brand) grid
    partial per block (~3750 cells) — ZERO shuffle."""
    ds = _read(sf_dir, "part",
               columns=["p_type", "p_brand", "p_retailprice"])

    def partial(t: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "ty": np.asarray(t.column("p_type")).astype(object),
            "br": np.asarray(t.column("p_brand")).astype(object),
            "v": np.floor(t.column("p_retailprice").to_numpy() * 100)
            .astype(np.int64)})
        df["v2"] = df["v"] * df["v"]
        g = df.groupby(["ty", "br"], as_index=False).agg(
            n=("v", "size"), s=("v", "sum"), q=("v2", "sum"))
        return pa.table({"ty": pa.array(g["ty"], type=pa.string()),
                         "br": pa.array(g["br"], type=pa.string()),
                         "n": pa.array(g["n"].to_numpy(np.int64)),
                         "s": pa.array(g["s"].to_numpy(np.int64)),
                         "q": pa.array(g["q"].to_numpy(np.int64))})

    cells = (ds.map_batches(partial, batch_format="pyarrow")
             .to_pandas().groupby(["ty", "br"], as_index=False).sum())
    n = int(cells["n"].sum())
    s_tot = int(cells["s"].sum())
    mbar = 1000 * s_tot // n
    tgrp = cells.groupby("ty").agg(n=("n", "sum"), s=("s", "sum"))
    mt = {ty: 1000 * int(r["s"]) // int(r["n"])
          for ty, r in tgrp.iterrows()}
    ss_type = sum(int(r["n"]) * (mt[ty] - mbar) ** 2
                  for ty, r in tgrp.iterrows())
    ss_brand = 0
    ss_within = 0
    for _, r in cells.iterrows():
        n_i, s_i, q_i = int(r["n"]), int(r["s"]), int(r["q"])
        m_i = 1000 * s_i // n_i
        ss_brand += n_i * (m_i - mt[r["ty"]]) ** 2
        ss_within += 1_000_000 * q_i - 2 * m_i * 1000 * s_i \
            + n_i * m_i * m_i
    n_types = len(tgrp)
    n_cells = len(cells)
    f_type_milli = 1000 * ss_type * (n_cells - n_types) \
        // (ss_brand * (n_types - 1))
    f_brand_milli = 1000 * ss_brand * (n - n_cells) \
        // (ss_within * (n_cells - n_types))
    tot = ss_type + ss_brand + ss_within
    return pd.DataFrame([(n, n_types, n_cells, ss_type // 1_000_000,
                          ss_brand // 1_000_000,
                          ss_within // 1_000_000, f_type_milli,
                          f_brand_milli, 10000 * ss_type // tot,
                          10000 * ss_brand // tot)],
                        columns=["n_parts", "n_types", "n_cells",
                                 "ss_type_sc", "ss_brand_sc",
                                 "ss_within_sc", "f_type_milli",
                                 "f_brand_milli", "type_share_bps",
                                 "brand_share_bps"]).astype("int64")


def events_markov_order_test(sf_dir: str) -> pd.DataFrame:
    """MARKOV ORDER selection — how much context does next-event-type
    prediction actually need? In-sample top-1 accuracy of the
    order-0 (global mode), order-1 (previous type) and order-2
    (previous two types) predictors, each scored on its own valid
    positions: correct = sum over contexts of max next-type count —
    an EXACT integer identity, no probabilities, no logs. One
    ``user % 64`` exchange co-locates each user's (ts, event_id)
    -ordered sequence; buckets emit trigram-count partials
    (|types|^3-bounded) and the driver derives every order's table
    by marginalization. The flattening-accuracy curve is the
    sequence-model-capacity router."""
    ds = _read(sf_dir, "events",
               columns=["event_id", "user_id", "ts", "event_type"])

    def derive(t: pa.Table) -> pa.Table:
        u = t.column("user_id").to_numpy().astype(np.int64)
        return pa.table({
            "user_id": pa.array(u),
            "ts_us": t.column("ts").cast(pa.int64()),
            "event_id": t.column("event_id"),
            "event_type": t.column("event_type"),
            "bucket": pa.array((u % 64).astype(np.int32))})

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        u = g["user_id"].to_numpy(np.int64)
        ts = g["ts_us"].to_numpy(np.int64)
        eid = g["event_id"].to_numpy(np.int64)
        order = np.lexsort((eid, ts, u))
        us = u[order]
        et = g["event_type"].to_numpy()[order]
        same1 = np.empty(len(us), dtype=bool)
        same1[0] = False
        same1[1:] = us[1:] == us[:-1]
        same2 = np.zeros(len(us), dtype=bool)
        same2[2:] = (us[2:] == us[1:-1]) & (us[1:-1] == us[:-2])
        idx = np.flatnonzero(same2)
        tri = pd.DataFrame({"p2": et[idx - 2], "p1": et[idx - 1],
                            "nx": et[idx]})
        tc = tri.groupby(["p2", "p1", "nx"], as_index=False).size()
        i1 = np.flatnonzero(same1)
        bi = pd.DataFrame({"p1": et[i1 - 1], "nx": et[i1]})
        bc = bi.groupby(["p1", "nx"], as_index=False).size()
        un = pd.DataFrame({"nx": et}).groupby("nx",
                                              as_index=False).size()
        tc["kind"] = 2
        bc["kind"] = 1
        bc["p2"] = ""
        un["kind"] = 0
        un["p2"] = ""
        un["p1"] = ""
        return pd.concat([tc, bc, un], ignore_index=True)[
            ["kind", "p2", "p1", "nx", "size"]]

    parts = (ds.map_batches(derive, batch_format="pyarrow")
             .groupby("bucket").map_groups(fold, batch_format="pandas")
             .to_pandas().groupby(["kind", "p2", "p1", "nx"],
                                  as_index=False)["size"].sum())
    rows = []
    for k, keys in ((0, []), (1, ["p1"]), (2, ["p2", "p1"])):
        sub = parts[parts["kind"] == k]
        if keys:
            mx = sub.groupby(keys)["size"].max()
            correct = int(mx.sum())
            n_ctx = len(mx)
        else:
            correct = int(sub["size"].max())
            n_ctx = 1
        total = int(sub["size"].sum())
        rows.append((k, n_ctx, total, correct,
                     10000 * correct // total))
    return pd.DataFrame(rows, columns=["order_k", "n_contexts",
                                       "n_predictions", "n_correct",
                                       "accuracy_bps"]).astype("int64")


def events_neyman_allocation(sf_dir: str) -> pd.DataFrame:
    """NEYMAN ALLOCATION plan — if the next monitoring pass can only
    afford a fixed sample, how should it split across event-type
    strata? Optimal share is proportional to N_h * sigma_h; with the
    full census in hand that reduces to w_h = floor(sqrt(V_h)) where
    V_h = n_h*sum(v^2) - S_h^2 is the exact integer variance
    numerator (Python bigints / HUGEINT; reported // 10^6 to stay
    int64) — ONE IEEE-matched sqrt per stratum, never summed in
    float. Reported against proportional allocation; the spread
    between them is the design-effect warning. Per-block per-type
    moment partials — ZERO shuffle."""
    import math

    ds = _read(sf_dir, "events", columns=["event_type", "value"])

    def partial(t: pa.Table) -> pa.Table:
        et = np.asarray(t.column("event_type")).astype(object)
        v = np.floor(t.column("value").to_numpy() * 100) \
            .astype(np.int64)
        code, uniq = pd.factorize(et)
        k = len(uniq)
        return pa.table({
            "et": pa.array(uniq.astype(str), type=pa.string()),
            "n": pa.array(np.bincount(code, minlength=k)
                          .astype(np.int64)),
            "s": pa.array(np.bincount(code, weights=v, minlength=k)
                          .astype(np.int64)),
            "q": pa.array(np.bincount(code, weights=v * v,
                                      minlength=k).astype(np.int64))})

    g = (ds.map_batches(partial, batch_format="pyarrow")
         .to_pandas().groupby("et", as_index=False).sum())
    g = g.sort_values("et", kind="mergesort").reset_index(drop=True)
    n_tot = int(g["n"].sum())
    ws = []
    vs = []
    for _, r in g.iterrows():
        v_num = int(r["n"]) * int(r["q"]) - int(r["s"]) ** 2
        vs.append(v_num)
        ws.append(math.floor(math.sqrt(float(v_num))))
    wsum = sum(ws)
    return pd.DataFrame({
        "event_type": g["et"], "n": g["n"].to_numpy(np.int64),
        "v_num_sc": [v // 1_000_000 for v in vs],
        "w": ws,
        "alloc_neyman_bps": [10000 * w // wsum for w in ws],
        "alloc_prop_bps": 10000 * g["n"].to_numpy(np.int64) // n_tot}) \
        .astype({c: "int64" for c in ("n", "v_num_sc", "w",
                                      "alloc_neyman_bps",
                                      "alloc_prop_bps")})


def embedding_thin_shell(sf_dir: str) -> pd.DataFrame:
    """THIN-SHELL concentration check — in healthy high-dimensional
    embeddings, squared norms concentrate in a narrow shell around
    their mean; heavy tails flag mixed scales or corrupt vectors.
    Two cheap scans: exact quantized squared norms (scaled // 10^6 so
    every later product stays int64) fold to (n, sum) first, then the
    +-10% band test runs as the cross-multiplied integer compare
    90*sum <= 100*n*ns2 <= 110*sum with the totals broadcast — no
    mean rational, no float. Reports the within/below/above census
    in exact bps. Per-block partials — ZERO shuffle."""
    ds = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet",
                               columns=["embedding"])

    def norms(t: pa.Table) -> np.ndarray:
        arr = t.column("embedding").combine_chunks()
        flat = arr.flatten().to_numpy(zero_copy_only=False)
        dim = len(flat) // len(arr)
        fp = np.floor(flat.astype(np.float64) * 1_000_000.0) \
            .astype(np.int64).reshape(-1, dim)
        return (fp * fp).sum(axis=1) // 1_000_000

    def phase1(t: pa.Table) -> pa.Table:
        ns2 = norms(t)
        return pa.table({"n": pa.array([np.int64(len(ns2))]),
                         "s": pa.array([np.int64(ns2.sum())])})

    m = ds.map_batches(phase1, batch_format="pyarrow").to_pandas()
    n = int(m["n"].sum())
    s = int(m["s"].sum())
    ref = ray.put((n, s))

    def phase2(t: pa.Table) -> pa.Table:
        n_, s_ = ray.get(ref)
        ns2 = norms(t)
        lhs = 100 * n_ * ns2
        below = int((lhs < 90 * s_).sum())
        above = int((lhs > 110 * s_).sum())
        return pa.table({
            "below": pa.array([np.int64(below)]),
            "above": pa.array([np.int64(above)]),
            "within": pa.array([np.int64(len(ns2) - below - above)])})

    c = ds.map_batches(phase2, batch_format="pyarrow").to_pandas()
    within = int(c["within"].sum())
    return pd.DataFrame([(n, s, within, int(c["below"].sum()),
                          int(c["above"].sum()),
                          10000 * within // n)],
                        columns=["n_vecs", "sum_ns2_sc", "n_within",
                                 "n_below", "n_above", "within_bps"]) \
        .astype("int64")


def orders_seasonal_mann_kendall(sf_dir: str) -> pd.DataFrame:
    """SEASONAL MANN-KENDALL — the trend gate that weekly seasonality
    cannot fool: the plain MK pair sweep runs WITHIN each weekday
    series separately (Hirsch-Slack rule), S and the tie-corrected
    18*Var sum across the seven seasons as exact integers, and the
    continuity-corrected z closes as the same ONE IEEE-matched float
    chain as ``orders_mann_kendall``. A trend that survives here is
    real drift, not day-of-week mix. Per-block daily partials — ZERO
    shuffle; the pair sweep is calendar-bounded per season."""
    import math

    ds = _read(sf_dir, "orders", columns=["o_orderdate", "o_totalprice"])

    def partial(t: pa.Table) -> pa.Table:
        dy = t.column("o_orderdate").cast(pa.int64()).to_numpy() \
            // 86_400_000_000
        rev = np.floor(t.column("o_totalprice").to_numpy() * 100) \
            .astype(np.int64)
        u, inv = np.unique(dy, return_inverse=True)
        return pa.table({
            "dy": pa.array(u),
            "rev": pa.array(np.bincount(inv, weights=rev,
                                        minlength=len(u))
                            .astype(np.int64))})

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    agg = (parts.groupby("dy", as_index=False)["rev"].sum()
           .sort_values("dy", kind="mergesort"))
    dy = agg["dy"].to_numpy(np.int64)
    rv = agg["rev"].to_numpy(np.int64)
    dow = (dy + 3) % 7
    s_tot = 0
    var18 = 0
    n_tot = 0
    for w in range(7):
        r = rv[dow == w]
        n = len(r)
        if n < 2:
            continue
        i, j = np.triu_indices(n, k=1)
        s_tot += int(np.sign(r[j] - r[i]).sum())
        _, counts = np.unique(r, return_counts=True)
        t_ = counts[counts > 1].astype(np.int64)
        var18 += n * (n - 1) * (2 * n + 5) \
            - int((t_ * (t_ - 1) * (2 * t_ + 5)).sum())
        n_tot += n
    if s_tot > 0:
        z_milli = math.floor(
            float(s_tot - 1) / math.sqrt(float(var18) / 18.0)
            * 1000.0)
    elif s_tot < 0:
        z_milli = math.floor(
            float(s_tot + 1) / math.sqrt(float(var18) / 18.0)
            * 1000.0)
    else:
        z_milli = 0
    return pd.DataFrame([(n_tot, s_tot, var18, z_milli)],
                        columns=["n_days", "s_stat", "var_x18",
                                 "z_milli"]).astype("int64")


def part_abc_migration(sf_dir: str) -> pd.DataFrame:
    """ABC CLASS MIGRATION — which parts moved between the A (top
    80% of revenue), B (next 15%), C (tail) and N (no sales) classes
    from the first calendar half to the second: the assortment-churn
    matrix a planner reads before re-slotting a warehouse. Class
    cuts are the exact cross-multiplied prefix tests 5*cum <= 4*T
    and 20*cum <= 19*T under the (revenue desc, partkey) total
    order — no share rational ever formed. Two per-(part, half)
    revenue-cents folds (block partials, part-cardinality driver
    grid) + the part dimension as the universe so never-sold parts
    land in N. Pure integers end to end."""
    ds = _read(sf_dir, "lineitem",
               columns=["l_partkey", "l_shipdate", "l_extendedprice",
                        "l_discount"])

    def span(t: pa.Table) -> pa.Table:
        d = t.column("l_shipdate").cast(pa.int64()).to_numpy() \
            // 86_400_000_000
        return pa.table({"lo": pa.array([np.int64(d.min())]),
                         "hi": pa.array([np.int64(d.max())])})

    sp = ds.map_batches(span, batch_format="pyarrow").to_pandas()
    mid = (int(sp["lo"].min()) + int(sp["hi"].max())) // 2

    def partial(t: pa.Table) -> pa.Table:
        pk = t.column("l_partkey").to_numpy().astype(np.int64)
        d = t.column("l_shipdate").cast(pa.int64()).to_numpy() \
            // 86_400_000_000
        rev = np.floor(t.column("l_extendedprice").to_numpy()
                       * (1 - t.column("l_discount").to_numpy())
                       * 100).astype(np.int64)
        key = pk * 2 + (d > mid)
        u, inv = np.unique(key, return_inverse=True)
        return pa.table({
            "key": pa.array(u),
            "rev": pa.array(np.bincount(inv, weights=rev,
                                        minlength=len(u))
                            .astype(np.int64))})

    per = (ds.map_batches(partial, batch_format="pyarrow")
           .to_pandas().groupby("key", as_index=False).sum())
    allpk = _read(sf_dir, "part", columns=["p_partkey"]).to_pandas() \
        ["p_partkey"].to_numpy(np.int64)

    def classify(half):
        sub = per[per["key"] % 2 == half]
        pk = (sub["key"].to_numpy(np.int64)) // 2
        rev = sub["rev"].to_numpy(np.int64)
        order = np.lexsort((pk, -rev))
        pk, rev = pk[order], rev[order]
        cum = np.cumsum(rev)
        t = int(cum[-1]) if len(cum) else 0
        cls = np.where(5 * cum <= 4 * t, 0,
                       np.where(20 * cum <= 19 * t, 1, 2))
        out = dict(zip(pk.tolist(), cls.tolist()))
        return out

    c1 = classify(0)
    c2 = classify(1)
    names = np.array(["A", "B", "C", "N"])
    cell = np.zeros((4, 4), dtype=np.int64)
    for p in allpk:
        cell[c1.get(int(p), 3), c2.get(int(p), 3)] += 1
    rows = [(names[i], names[j], int(cell[i, j]))
            for i in range(4) for j in range(4) if cell[i, j] > 0]
    return pd.DataFrame(rows, columns=["from_class", "to_class",
                                       "n_parts"]) \
        .astype({"n_parts": "int64"})


def events_type_user_gini(sf_dir: str) -> pd.DataFrame:
    """USER-CONCENTRATION per event type — exact Gini of each type's
    per-user count distribution plus the top-user share: is 'click'
    broad-based while 'purchase' rides on whales? The sorted-rank
    identity sum((2r - n - 1) * c) closes Gini as one integer bps
    floor per type (tie-permutation invariant). Per-block (type,
    user) count partials fold at users x types cardinality on the
    driver (at petabyte user counts the identity distributes as a
    per-type rank exchange). Pure integers."""
    ds = _read(sf_dir, "events", columns=["event_type", "user_id"])

    def partial(t: pa.Table) -> pa.Table:
        et = np.asarray(t.column("event_type")).astype(object)
        u = t.column("user_id").to_numpy().astype(np.int64)
        df = pd.DataFrame({"et": et, "u": u})
        g = df.groupby(["et", "u"], as_index=False).size()
        return pa.table({"et": pa.array(g["et"], type=pa.string()),
                         "u": pa.array(g["u"].to_numpy(np.int64)),
                         "c": pa.array(g["size"].to_numpy(np.int64))})

    per = (ds.map_batches(partial, batch_format="pyarrow")
           .to_pandas().groupby(["et", "u"], as_index=False)["c"]
           .sum())
    rows = []
    for et, g in per.groupby("et"):
        c = np.sort(g["c"].to_numpy(np.int64))
        n = len(c)
        t = int(c.sum())
        s = int(((2 * np.arange(1, n + 1, dtype=np.int64) - n - 1)
                 * c).sum())
        rows.append((str(et), n, t, 10000 * s // (n * t),
                     10000 * int(c[-1]) // t))
    return pd.DataFrame(sorted(rows), columns=[
        "event_type", "n_users", "n_events", "gini_bps",
        "top_user_bps"]).astype(
        {c: "int64" for c in ("n_users", "n_events", "gini_bps",
                              "top_user_bps")})


def part_name_price_premium(sf_dir: str) -> pd.DataFrame:
    """NAMING PREMIUM — does the leading adjective in a part's name
    ('large', 'small', ...) carry a retail-price premium? Mean price
    per first token in exact milli-cents (truncating integer mean)
    and the premium vs the global mean closed cross-multiplied as
    1000*S_g*N // (n_g*S) - 1000 (all operands positive, so the
    floor agrees on both sides) — the catalog-linguistics screen
    before naming-based feature engineering. Per-block (token, n,
    sum) partials — token-cardinality grid, ZERO shuffle, pure
    integers."""
    ds = _read(sf_dir, "part", columns=["p_name", "p_retailprice"])

    def partial(t: pa.Table) -> pa.Table:
        names = np.asarray(t.column("p_name")).astype(object)
        tok = np.array([s.split(" ", 1)[0] for s in names],
                       dtype=object)
        v = np.floor(t.column("p_retailprice").to_numpy() * 100) \
            .astype(np.int64)
        code, uniq = pd.factorize(tok)
        k = len(uniq)
        return pa.table({
            "tok": pa.array(uniq.astype(str), type=pa.string()),
            "n": pa.array(np.bincount(code, minlength=k)
                          .astype(np.int64)),
            "s": pa.array(np.bincount(code, weights=v, minlength=k)
                          .astype(np.int64))})

    g = (ds.map_batches(partial, batch_format="pyarrow")
         .to_pandas().groupby("tok", as_index=False).sum()
         .sort_values("tok", kind="mergesort"))
    n_tot = int(g["n"].sum())
    s_tot = int(g["s"].sum())
    n = g["n"].to_numpy(np.int64)
    s = g["s"].to_numpy(np.int64)
    prem = []
    for ni, si in zip(n, s):
        num = 1000 * int(si) * n_tot
        den = int(ni) * s_tot
        prem.append(num // den - 1000)
    return pd.DataFrame({
        "token": g["tok"], "n_parts": n,
        "mean_milli": 1000 * s // n,
        "premium_milli": prem}).astype(
        {c: "int64" for c in ("n_parts", "mean_milli",
                              "premium_milli")})


def events_next_value_by_type(sf_dir: str) -> pd.DataFrame:
    """NEXT-EVENT VALUE by current type — the one-step Markov reward:
    after a 'click', what does the NEXT event carry on average? Mean
    next-event value in exact truncating milli-cents per current
    type, with the lift vs the global next-value mean closed as the
    cross-multiplied integer 1000*S_t*N // (n_t*S) - 1000. Pairs come
    from the shared one-exchange (ts, event_id)-ordered sequence
    kernel; buckets emit (type, n, sum) partials. The
    session-economics table a recommender reads. Pure integers."""
    ds = _read(sf_dir, "events",
               columns=["event_id", "user_id", "ts", "event_type",
                        "value"])

    def derive(t: pa.Table) -> pa.Table:
        u = t.column("user_id").to_numpy().astype(np.int64)
        return pa.table({
            "user_id": pa.array(u),
            "ts_us": t.column("ts").cast(pa.int64()),
            "event_id": t.column("event_id"),
            "event_type": t.column("event_type"),
            "cents": pa.array(np.floor(
                t.column("value").to_numpy() * 100).astype(np.int64)),
            "bucket": pa.array((u % 64).astype(np.int32))})

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        u = g["user_id"].to_numpy(np.int64)
        ts = g["ts_us"].to_numpy(np.int64)
        eid = g["event_id"].to_numpy(np.int64)
        order = np.lexsort((eid, ts, u))
        us = u[order]
        et = g["event_type"].to_numpy()[order]
        cv = g["cents"].to_numpy(np.int64)[order]
        same = np.empty(len(us), dtype=bool)
        same[0] = False
        same[1:] = us[1:] == us[:-1]
        idx = np.flatnonzero(same)
        df = pd.DataFrame({"cur": et[idx - 1], "nv": cv[idx]})
        out = df.groupby("cur", as_index=False).agg(
            n=("nv", "size"), s=("nv", "sum"))
        return out

    g = (ds.map_batches(derive, batch_format="pyarrow")
         .groupby("bucket").map_groups(fold, batch_format="pandas")
         .to_pandas().groupby("cur", as_index=False).sum()
         .sort_values("cur", kind="mergesort"))
    n_tot = int(g["n"].sum())
    s_tot = int(g["s"].sum())
    n = g["n"].to_numpy(np.int64)
    s = g["s"].to_numpy(np.int64)
    lift = [1000 * int(si) * n_tot // (int(ni) * s_tot) - 1000
            for ni, si in zip(n, s)]
    return pd.DataFrame({
        "cur_type": g["cur"], "n_pairs": n,
        "sum_next_cents": s, "mean_next_milli": 1000 * s // n,
        "lift_milli": lift}).astype(
        {c: "int64" for c in ("n_pairs", "sum_next_cents",
                              "mean_next_milli", "lift_milli")})


def lineitem_status_stump(sf_dir: str) -> pd.DataFrame:
    """DECISION-STUMP training, exactly — the 1-D split every tree
    ensemble grows from: the ship-date threshold d* that best
    separates linestatus F from O under the rule "predict F iff
    day <= d", found by an EXACT error scan errors(d) = cumO(d) +
    (totF - cumF(d)) over the per-(status, day) histogram (bounded
    2 x calendar cells, folded map-side — the rows never move).
    Earliest-day tie rule; candidate thresholds are the observed
    days. Reports the split, its error mass vs the majority-class
    baseline, both in exact bps. Pure integers end to end."""
    ds = _read(sf_dir, "lineitem",
               columns=["l_linestatus", "l_shipdate"])

    def partial(t: pa.Table) -> pa.Table:
        st = np.asarray(t.column("l_linestatus")).astype(object)
        d = t.column("l_shipdate").cast(pa.int64()).to_numpy() \
            // 86_400_000_000
        is_f = (st == "F").astype(np.int64)
        key = d * 2 + is_f
        u, cnt = np.unique(key, return_counts=True)
        return pa.table({"key": pa.array(u),
                         "c": pa.array(cnt.astype(np.int64))})

    g = (ds.map_batches(partial, batch_format="pyarrow")
         .to_pandas().groupby("key", as_index=False).sum())
    key = g["key"].to_numpy(np.int64)
    c = g["c"].to_numpy(np.int64)
    d = key // 2
    isf = key % 2
    days = np.unique(d)
    co = np.zeros(len(days), np.int64)
    cf = np.zeros(len(days), np.int64)
    pos = np.searchsorted(days, d)
    np.add.at(co, pos[isf == 0], c[isf == 0])
    np.add.at(cf, pos[isf == 1], c[isf == 1])
    cum_o = np.cumsum(co)
    cum_f = np.cumsum(cf)
    tot_o = int(cum_o[-1])
    tot_f = int(cum_f[-1])
    n = tot_o + tot_f
    err = cum_o + (tot_f - cum_f)
    bi = int(np.argmin(err))
    best_day = int(days[bi])
    min_err = int(err[bi])
    base = min(tot_o, tot_f)
    return pd.DataFrame([(n, tot_o, tot_f, best_day, min_err,
                          10000 * min_err // n, 10000 * base // n)],
                        columns=["n_lines", "n_o", "n_f", "best_day",
                                 "min_errors", "err_bps",
                                 "base_err_bps"]).astype("int64")


def order_supplier_spread(sf_dir: str) -> pd.DataFrame:
    """ORDER FAN-OUT census — how many distinct suppliers does one
    order touch? The co-location question behind every "ship
    complete" SLA and the justification for supplier-bucketed
    layouts: orders band by distinct-supplier count (1/2/3/4+) with
    order shares and line mass per band. One ``orderkey % 64``
    exchange of block-level (order, supplier, lines) partials; each
    bucket folds its orders to one 4-cell histogram row — the driver
    sums bucket rows. Pure integers."""
    ds = _read(sf_dir, "lineitem", columns=["l_orderkey", "l_suppkey"])

    def derive(t: pa.Table) -> pa.Table:
        ok = t.column("l_orderkey").to_numpy().astype(np.int64)
        sk = t.column("l_suppkey").to_numpy().astype(np.int64)
        key = ok * 16384 + (sk % 16384)
        u, cnt = np.unique(key, return_counts=True)
        return pa.table({
            "ok": pa.array(u // 16384),
            "sk": pa.array(u % 16384),
            "c": pa.array(cnt.astype(np.int64)),
            "bucket": pa.array(((u // 16384) % 64).astype(np.int32))})

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        key = g["ok"].to_numpy(np.int64) * 16384 \
            + g["sk"].to_numpy(np.int64)
        u, inv = np.unique(key, return_inverse=True)
        cl = np.bincount(inv, weights=g["c"].to_numpy(np.int64),
                         minlength=len(u)).astype(np.int64)
        ok = u // 16384
        ou, oinv = np.unique(ok, return_inverse=True)
        nsupp = np.bincount(oinv, minlength=len(ou)).astype(np.int64)
        nline = np.bincount(oinv, weights=cl, minlength=len(ou)) \
            .astype(np.int64)
        band = np.minimum(nsupp, 4)
        rows = []
        for b in (1, 2, 3, 4):
            m = band == b
            rows.append((b, int(m.sum()), int(nline[m].sum())))
        return pd.DataFrame(rows, columns=["band", "n_orders",
                                           "n_lines"])

    g = (ds.map_batches(derive, batch_format="pyarrow")
         .groupby("bucket").map_groups(fold, batch_format="pandas")
         .to_pandas().groupby("band", as_index=False).sum())
    n_tot = int(g["n_orders"].sum())
    l_tot = int(g["n_lines"].sum())
    g = g[g["n_orders"] > 0].sort_values("band") \
        .reset_index(drop=True)
    g["order_share_bps"] = 10000 * g["n_orders"].to_numpy(np.int64) \
        // n_tot
    g["line_share_bps"] = 10000 * g["n_lines"].to_numpy(np.int64) \
        // l_tot
    return g.astype("int64")


def lineitem_moods_median(sf_dir: str) -> pd.DataFrame:
    """MOOD'S MEDIAN TEST — do the return-flag populations share one
    median quantity? The nonparametric k-sample location gate that
    (unlike Kruskal-Wallis) only needs the 2 x k above/at-or-below
    grid: the global median comes from the exact ceil-rank order
    statistic over the bounded (flag, qty) histogram, the dichotomy
    is qty <= med vs qty > med, and chi-square closes as the
    order-free sum of per-cell integer floors
    1000*(N*O - r*c)^2 // (N*r*c) in Python bigints / HUGEINT.
    Constant 3x50 grid partials per block — ZERO shuffle."""
    ds = _read(sf_dir, "lineitem",
               columns=["l_returnflag", "l_quantity"])

    def partial(t: pa.Table) -> pa.Table:
        fl = np.asarray(t.column("l_returnflag")).astype(object)
        q = np.floor(t.column("l_quantity").to_numpy()) \
            .astype(np.int64)
        code, uniq = pd.factorize(fl)
        key = code.astype(np.int64) * 64 + q
        u, cnt = np.unique(key, return_counts=True)
        return pa.table({
            "fl": pa.array(uniq.take(u // 64).astype(str),
                           type=pa.string()),
            "q": pa.array(u % 64),
            "c": pa.array(cnt.astype(np.int64))})

    g = (ds.map_batches(partial, batch_format="pyarrow")
         .to_pandas().groupby(["fl", "q"], as_index=False).sum())
    qh = g.groupby("q")["c"].sum().sort_index()
    cum = qh.cumsum()
    n = int(cum.iloc[-1])
    med = int(qh.index[int(np.searchsorted(
        cum.to_numpy(), (n + 1) // 2))])
    flags = sorted(g["fl"].unique())
    lo_tot = 0
    cells = {}
    for f in flags:
        sub = g[g["fl"] == f]
        qq = sub["q"].to_numpy(np.int64)
        cc = sub["c"].to_numpy(np.int64)
        lo = int(cc[qq <= med].sum())
        hi = int(cc[qq > med].sum())
        cells[f] = (lo, hi)
        lo_tot += lo
    hi_tot = n - lo_tot
    chi2 = 0
    for f in flags:
        lo, hi = cells[f]
        r = lo + hi
        for o, ctot in ((lo, lo_tot), (hi, hi_tot)):
            dev = n * o - r * ctot
            chi2 += 1000 * dev * dev // (n * r * ctot)
    return pd.DataFrame([(n, med, lo_tot, hi_tot, chi2,
                          len(flags) - 1)],
                        columns=["n_lines", "med_qty", "n_le",
                                 "n_gt", "chi2_milli", "df"]) \
        .astype("int64")


def join_size_estimator_audit(sf_dir: str) -> pd.DataFrame:
    """JOIN-CARDINALITY estimator audit — the query-optimizer sanity
    check: the textbook uniform estimate |R|^2 / d for the partkey
    self-join vs the EXACT size sum(c_p^2) (the F2 moment).
    Cauchy-Schwarz guarantees est <= actual; the gap in milli is
    exactly how much key skew the uniform assumption hides — the
    number that decides whether a broadcast plan blows up at 100 TB.
    Per-part count fold (part-cardinality driver grid); top-key
    contribution reported in bps. Pure integers."""
    ds = _read(sf_dir, "lineitem", columns=["l_partkey"])

    def partial(t: pa.Table) -> pa.Table:
        pk = t.column("l_partkey").to_numpy().astype(np.int64)
        u, cnt = np.unique(pk, return_counts=True)
        return pa.table({"pk": pa.array(u),
                         "c": pa.array(cnt.astype(np.int64))})

    g = (ds.map_batches(partial, batch_format="pyarrow")
         .to_pandas().groupby("pk", as_index=False).sum())
    c = g["c"].to_numpy(np.int64)
    n = int(c.sum())
    d = len(c)
    actual = int((c * c).sum())
    est = n * n // d
    top = int((c * c).max())
    return pd.DataFrame([(n, d, est, actual,
                          1000 * est // actual,
                          10000 * top // actual)],
                        columns=["n_rows", "n_distinct", "est_rows",
                                 "actual_rows",
                                 "est_over_actual_milli",
                                 "top_key_share_bps"]) \
        .astype("int64")


def supplier_cr_ratios(sf_dir: str) -> pd.DataFrame:
    """CONCENTRATION RATIOS per supplier nation — CR1/CR4/CR8 revenue
    shares (the antitrust screen that reads differently from HHI:
    CR4 > 60% = tight oligopoly even when HHI looks moderate) under
    the exact (revenue desc, suppkey asc) total order. Per-supplier
    revenue folds map-side (supplier-cardinality driver grid, nation
    via the dimension LUT); shares close as integer bps floors.
    Pure integers end to end."""
    supp = _read(sf_dir, "supplier",
                 columns=["s_suppkey", "s_nationkey"]).to_pandas()
    sk = supp["s_suppkey"].to_numpy(np.int64)
    s_nat = np.zeros(sk.max() + 1, dtype=np.int64)
    s_nat[sk] = supp["s_nationkey"].to_numpy(np.int64)

    ds = _read(sf_dir, "lineitem",
               columns=["l_suppkey", "l_extendedprice", "l_discount"])

    def partial(t: pa.Table) -> pa.Table:
        s = t.column("l_suppkey").to_numpy().astype(np.int64)
        rev = np.floor(t.column("l_extendedprice").to_numpy()
                       * (1 - t.column("l_discount").to_numpy())
                       * 100).astype(np.int64)
        u, inv = np.unique(s, return_inverse=True)
        return pa.table({
            "sk": pa.array(u),
            "rev": pa.array(np.bincount(inv, weights=rev,
                                        minlength=len(u))
                            .astype(np.int64))})

    g = (ds.map_batches(partial, batch_format="pyarrow")
         .to_pandas().groupby("sk", as_index=False).sum())
    skv = g["sk"].to_numpy(np.int64)
    rev = g["rev"].to_numpy(np.int64)
    nk = s_nat[skv]
    rows = []
    for n in np.unique(nk):
        m = nk == n
        r = rev[m]
        s = skv[m]
        order = np.lexsort((s, -r))
        r = r[order]
        tot = int(r.sum())
        crs = [10000 * int(r[:k].sum()) // tot for k in (1, 4, 8)]
        rows.append((int(n), int(m.sum()), tot, *crs))
    return pd.DataFrame(rows, columns=[
        "s_nationkey", "n_suppliers", "rev_cents", "cr1_bps",
        "cr4_bps", "cr8_bps"]).astype("int64")


def events_group_sequential(sf_dir: str) -> pd.DataFrame:
    """GROUP-SEQUENTIAL A/B monitoring — the O'Brien-Fleming audit: at
    four equally-spaced calendar looks, the Welch z between the
    id-parity arms' event values is compared to the classic OBF
    boundaries (4.333 / 2.963 / 2.359 / 2.014, fixed milli
    constants): would a peeking analyst have stopped early? Exact
    per-(arm, quartile) integer moments accumulate across looks; z
    closes per look as ONE IEEE-order-matched float chain (the
    ``events_ttest`` discipline). A tiny span pre-pass anchors the
    look calendar; per-block partials are an 8-cell grid — ZERO
    shuffle."""
    import math

    ds = _read(sf_dir, "events", columns=["user_id", "ts", "value"])

    def span(t: pa.Table) -> pa.Table:
        d = t.column("ts").cast(pa.int64()).to_numpy() // _DAY_US
        return pa.table({"lo": pa.array([np.int64(d.min())]),
                         "hi": pa.array([np.int64(d.max())])})

    sp = ds.map_batches(span, batch_format="pyarrow").to_pandas()
    lo, hi = int(sp["lo"].min()), int(sp["hi"].max())
    spn = hi - lo + 1

    def partial(t: pa.Table) -> pa.Table:
        d = t.column("ts").cast(pa.int64()).to_numpy() // _DAY_US
        arm = t.column("user_id").to_numpy().astype(np.int64) % 2
        v = np.floor(t.column("value").to_numpy() * 100) \
            .astype(np.int64)
        qi = np.minimum((d - lo) * 4 // spn, 3)
        cell = arm * 4 + qi
        n = np.bincount(cell, minlength=8).astype(np.int64)
        s = np.bincount(cell, weights=v, minlength=8).astype(np.int64)
        q = np.bincount(cell, weights=v * v, minlength=8) \
            .astype(np.int64)
        return pa.table({"cell": pa.array(np.arange(8,
                                                    dtype=np.int64)),
                         "n": pa.array(n), "s": pa.array(s),
                         "q": pa.array(q)})

    agg = (ds.map_batches(partial, batch_format="pyarrow")
           .to_pandas().groupby("cell").sum())
    bounds = [4333, 2963, 2359, 2014]
    rows = []
    for k in range(4):
        st = {}
        for arm in (0, 1):
            cells = [arm * 4 + j for j in range(k + 1)]
            n = sum(int(agg.loc[c, "n"]) for c in cells
                    if c in agg.index)
            s = sum(int(agg.loc[c, "s"]) for c in cells
                    if c in agg.index)
            q = sum(int(agg.loc[c, "q"]) for c in cells
                    if c in agg.index)
            st[arm] = (n, s, n * q - s * s)
        n0, s0, va0 = st[0]
        n1, s1, va1 = st[1]
        z = (float(s1) / n1 - float(s0) / n0) / math.sqrt(
            float(va1) / ((n1 - 1) * n1 * n1)
            + float(va0) / ((n0 - 1) * n0 * n0))
        zm = math.floor(z * 1000.0)
        rows.append((k + 1, n0, n1, zm, bounds[k],
                     1 if abs(zm) >= bounds[k] else 0))
    return pd.DataFrame(rows, columns=["look", "n_arm0", "n_arm1",
                                       "z_milli", "boundary_milli",
                                       "crossed"]).astype("int64")


def lineitem_ansari_bradley(sf_dir: str) -> pd.DataFrame:
    """ANSARI-BRADLEY scale comparison — do O and F lines have the
    same quantity SPREAD (not location)? The rank-score test kept
    permutation-exact under ties: doubled midranks 2r = 2s + c + 1
    over the bounded (status, qty) histogram, the AB score per value
    is min(2r, 2(N+1) - 2r) (small at both extremes, large in the
    middle — low sample score = wider spread), and instead of the
    tie-broken normal approximation the op closes the EXACT
    permutation-null comparison: E[AB1] = n1 * AB_total / N, so the
    centered deviation N*AB1 - n1*AB_total and the milli lift
    1000*N*AB1 // (n1*AB_total) - 1000 are pure integers (negative
    lift = sample 1 spreads wider). Constant 2x50 grid partials —
    ZERO shuffle."""
    ds = _read(sf_dir, "lineitem",
               columns=["l_linestatus", "l_quantity"])

    def partial(t: pa.Table) -> pa.Table:
        st = np.asarray(t.column("l_linestatus")).astype(object)
        q = np.floor(t.column("l_quantity").to_numpy()) \
            .astype(np.int64)
        is_f = (st == "F").astype(np.int64)
        key = q * 2 + is_f
        u, cnt = np.unique(key, return_counts=True)
        return pa.table({"key": pa.array(u),
                         "c": pa.array(cnt.astype(np.int64))})

    g = (ds.map_batches(partial, batch_format="pyarrow")
         .to_pandas().groupby("key", as_index=False).sum())
    key = g["key"].to_numpy(np.int64)
    cc = g["c"].to_numpy(np.int64)
    qv = np.unique(key // 2)
    c_o = np.zeros(len(qv), np.int64)
    c_f = np.zeros(len(qv), np.int64)
    pos = np.searchsorted(qv, key // 2)
    np.add.at(c_o, pos[key % 2 == 0], cc[key % 2 == 0])
    np.add.at(c_f, pos[key % 2 == 1], cc[key % 2 == 1])
    ctot = c_o + c_f
    n = int(ctot.sum())
    smaller = np.concatenate(([0], np.cumsum(ctot)[:-1]))
    r2 = 2 * smaller + ctot + 1
    score = np.minimum(r2, 2 * (n + 1) - r2)
    ab_o = int((score * c_o).sum())
    ab_tot = int((score * ctot).sum())
    n_o = int(c_o.sum())
    dev = n * ab_o - n_o * ab_tot
    lift = 1000 * n * ab_o // (n_o * ab_tot) - 1000
    return pd.DataFrame([(n_o, n - n_o, ab_o, ab_tot, dev, lift)],
                        columns=["n_o", "n_f", "ab2_o", "ab2_total",
                                 "dev_num", "lift_milli"]) \
        .astype("int64")


def user_dow_habit(sf_dir: str) -> pd.DataFrame:
    """HABIT STRENGTH census — how concentrated is each user's
    activity on their favorite weekday? Users band by top-dow share
    (sparse < 7 events; then < 20% / < 40% / < 70% / >= 70% in bps)
    — the routine-vs-roaming segmentation a scheduler keys send
    windows on. One ``user % 64`` exchange of per-block (user, dow)
    count partials; buckets fold per-user maxima and emit one 5-cell
    band histogram row each. Pure integers."""
    ds = _read(sf_dir, "events", columns=["user_id", "ts"])

    def derive(t: pa.Table) -> pa.Table:
        u = t.column("user_id").to_numpy().astype(np.int64)
        d = t.column("ts").cast(pa.int64()).to_numpy() // _DAY_US
        key = u * 8 + (d + 3) % 7
        ku, cnt = np.unique(key, return_counts=True)
        return pa.table({
            "u": pa.array(ku // 8),
            "dw": pa.array(ku % 8),
            "c": pa.array(cnt.astype(np.int64)),
            "bucket": pa.array(((ku // 8) % 64).astype(np.int32))})

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        key = g["u"].to_numpy(np.int64) * 8 + g["dw"].to_numpy(np.int64)
        ku, inv = np.unique(key, return_inverse=True)
        c = np.bincount(inv, weights=g["c"].to_numpy(np.int64),
                        minlength=len(ku)).astype(np.int64)
        uu, uinv = np.unique(ku // 8, return_inverse=True)
        tot = np.bincount(uinv, weights=c, minlength=len(uu)) \
            .astype(np.int64)
        mx = np.zeros(len(uu), np.int64)
        np.maximum.at(mx, uinv, c)
        share = 10000 * mx // tot
        band = np.where(tot < 7, 0,
                        np.where(share < 2000, 1,
                                 np.where(share < 4000, 2,
                                          np.where(share < 7000, 3,
                                                   4))))
        h = np.bincount(band, minlength=5).astype(np.int64)
        return pd.DataFrame({"band": np.arange(5, dtype=np.int64),
                             "n_users": h})

    g = (ds.map_batches(derive, batch_format="pyarrow")
         .groupby("bucket").map_groups(fold, batch_format="pandas")
         .to_pandas().groupby("band", as_index=False).sum())
    tot = int(g["n_users"].sum())
    g = g[g["n_users"] > 0].sort_values("band").reset_index(drop=True)
    g["share_bps"] = 10000 * g["n_users"].to_numpy(np.int64) // tot
    return g.astype("int64")


def customer_value_trend_census(sf_dir: str) -> pd.DataFrame:
    """PER-CUSTOMER TREND census — is each customer's order value
    rising, flat or falling over their own order sequence? The
    per-entity OLS run at full customer cardinality WITHOUT a single
    division: with x = within-customer order index the slope's SIGN
    is the sign of the exact integer n*sum(xy) - sum(x)*sum(y)
    (the denominator is always positive), so the census (up / flat /
    down, customers with < 3 orders gated to 'few') is pure integer
    arithmetic. One ``custkey % 64`` exchange; buckets lexsort their
    customers' (date, orderkey)-ordered histories, fold segment
    moments vectorized and emit one 4-cell histogram row each."""
    ds = _read(sf_dir, "orders",
               columns=["o_custkey", "o_orderdate", "o_orderkey",
                        "o_totalprice"])

    def derive(t: pa.Table) -> pa.Table:
        ck = t.column("o_custkey").to_numpy().astype(np.int64)
        return pa.table({
            "ck": pa.array(ck),
            "d": t.column("o_orderdate").cast(pa.int64()),
            "ok": t.column("o_orderkey"),
            "cents": pa.array(np.floor(
                t.column("o_totalprice").to_numpy() * 100)
                .astype(np.int64)),
            "bucket": pa.array((ck % 64).astype(np.int32))})

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        ck = g["ck"].to_numpy(np.int64)
        d = g["d"].to_numpy(np.int64)
        ok = g["ok"].to_numpy(np.int64)
        y = g["cents"].to_numpy(np.int64)
        order = np.lexsort((ok, d, ck))
        ck, y = ck[order], y[order]
        brk = np.empty(len(ck), dtype=bool)
        brk[0] = True
        brk[1:] = ck[1:] != ck[:-1]
        seg = np.cumsum(brk) - 1
        starts = np.flatnonzero(brk)
        x = np.arange(len(ck), dtype=np.int64) - starts[seg]
        k = seg[-1] + 1 if len(seg) else 0
        n = np.bincount(seg, minlength=k).astype(np.int64)
        sy = np.bincount(seg, weights=y, minlength=k).astype(np.int64)
        sxy = np.bincount(seg, weights=x * y, minlength=k) \
            .astype(np.int64)
        sx = n * (n - 1) // 2
        num = n * sxy - sx * sy
        band = np.where(n < 3, 0,
                        np.where(num > 0, 1,
                                 np.where(num < 0, 3, 2)))
        h = np.bincount(band, minlength=4).astype(np.int64)
        return pd.DataFrame({"band": np.arange(4, dtype=np.int64),
                             "n_customers": h})

    g = (ds.map_batches(derive, batch_format="pyarrow")
         .groupby("bucket").map_groups(fold, batch_format="pandas")
         .to_pandas().groupby("band", as_index=False).sum())
    tot = int(g["n_customers"].sum())
    g = g[g["n_customers"] > 0].sort_values("band") \
        .reset_index(drop=True)
    g["share_bps"] = 10000 * g["n_customers"].to_numpy(np.int64) \
        // tot
    names = np.array(["few", "up", "flat", "down"])
    g["trend"] = names[g["band"].to_numpy(np.int64)]
    return g[["band", "trend", "n_customers", "share_bps"]].astype(
        {"band": "int64", "n_customers": "int64",
         "share_bps": "int64"})


def brand_mix_drift_series(sf_dir: str) -> pd.DataFrame:
    """MIX-DRIFT time series — month-over-month total-variation
    distance of the brand revenue mix: the drift monitor that pages
    BEFORE a model trained on last month's mix degrades. Calendar
    months (months-since-epoch, identical on both sides), brand
    shares never formed: TV per consecutive month pair closes fully
    cross-multiplied as sum_b |x_bm * T_{m+1} - x_b,m+1 * T_m| //
    (2 * T_m * T_{m+1}) in Python bigints / HUGEINT with absent
    brands zero-filled. Part->brand LUT broadcast; per-block
    (month, brand) revenue partials — months x 25 cells, ZERO row
    shuffle."""
    import ray

    part = _read(sf_dir, "part",
                 columns=["p_partkey", "p_brand"]).to_pandas()
    bcode, buniq = pd.factorize(part["p_brand"], sort=True)
    pk = part["p_partkey"].to_numpy(np.int64)
    p_br = np.zeros(pk.max() + 1, dtype=np.int64)
    p_br[pk] = bcode
    nb = len(buniq)
    ref = ray.put(p_br)

    ds = _read(sf_dir, "lineitem",
               columns=["l_partkey", "l_shipdate", "l_extendedprice",
                        "l_discount"])

    def partial(t: pa.Table) -> pa.Table:
        p_br_ = ray.get(ref)
        d = t.column("l_shipdate").cast(pa.int64()).to_numpy() \
            // 86_400_000_000
        mo = d.astype("datetime64[D]").astype("datetime64[M]") \
            .astype(np.int64)
        br = p_br_[t.column("l_partkey").to_numpy().astype(np.int64)]
        rev = np.floor(t.column("l_extendedprice").to_numpy()
                       * (1 - t.column("l_discount").to_numpy())
                       * 100).astype(np.int64)
        key = mo * 32 + br
        u, inv = np.unique(key, return_inverse=True)
        return pa.table({
            "key": pa.array(u),
            "rev": pa.array(np.bincount(inv, weights=rev,
                                        minlength=len(u))
                            .astype(np.int64))})

    g = (ds.map_batches(partial, batch_format="pyarrow")
         .to_pandas().groupby("key", as_index=False).sum())
    mo = g["key"].to_numpy(np.int64) // 32
    br = g["key"].to_numpy(np.int64) % 32
    rev = g["rev"].to_numpy(np.int64)
    months = np.unique(mo)
    grid = np.zeros((len(months), nb), dtype=np.int64)
    grid[np.searchsorted(months, mo), br] = rev
    tots = grid.sum(axis=1)
    rows = []
    for i in range(1, len(months)):
        t0, t1 = int(tots[i - 1]), int(tots[i])
        tv = sum(abs(int(grid[i - 1, b]) * t1
                     - int(grid[i, b]) * t0) for b in range(nb))
        rows.append((int(months[i]), t0, t1,
                     10000 * tv // (2 * t0 * t1)))
    return pd.DataFrame(rows, columns=["month", "prev_cents",
                                       "cur_cents", "tv_bps"]) \
        .astype("int64")


def events_dwell_runs(sf_dir: str) -> pd.DataFrame:
    """DWELL / SOJOURN census — when a user enters an event type, how
    long do they STAY before switching? Maximal same-type runs per
    user sequence (the gaps-and-islands rid = rn_user - rn_user_type
    identity in the twin, a vectorized run-break scan here): per
    type, run count, total events, mean dwell as one integer milli
    floor and the longest run. The self-transition structure a
    session model needs beyond the transition matrix. ONE user
    exchange; buckets emit per-type partials (type-cardinality
    rows). Pure integers."""
    ds = _read(sf_dir, "events",
               columns=["event_id", "user_id", "ts", "event_type"])

    def derive(t: pa.Table) -> pa.Table:
        u = t.column("user_id").to_numpy().astype(np.int64)
        return pa.table({
            "user_id": pa.array(u),
            "ts_us": t.column("ts").cast(pa.int64()),
            "event_id": t.column("event_id"),
            "event_type": t.column("event_type"),
            "bucket": pa.array((u % 64).astype(np.int32))})

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        u = g["user_id"].to_numpy(np.int64)
        ts = g["ts_us"].to_numpy(np.int64)
        eid = g["event_id"].to_numpy(np.int64)
        order = np.lexsort((eid, ts, u))
        us = u[order]
        et = g["event_type"].to_numpy()[order]
        brk = np.empty(len(us), dtype=bool)
        brk[0] = True
        brk[1:] = (us[1:] != us[:-1]) | (et[1:] != et[:-1])
        rid = np.cumsum(brk) - 1
        ln = np.bincount(rid).astype(np.int64)
        rtype = et[np.flatnonzero(brk)]
        df = pd.DataFrame({"et": rtype, "ln": ln})
        out = df.groupby("et", as_index=False).agg(
            n_runs=("ln", "size"), n_events=("ln", "sum"),
            max_run=("ln", "max"))
        return out

    g = (ds.map_batches(derive, batch_format="pyarrow")
         .groupby("bucket").map_groups(fold, batch_format="pandas")
         .to_pandas().groupby("et", as_index=False).agg(
             n_runs=("n_runs", "sum"), n_events=("n_events", "sum"),
             max_run=("max_run", "max"))
         .sort_values("et", kind="mergesort").reset_index(drop=True))
    g["mean_dwell_milli"] = 1000 * g["n_events"].to_numpy(np.int64) \
        // g["n_runs"].to_numpy(np.int64)
    return g.rename(columns={"et": "event_type"}).astype(
        {c: "int64" for c in ("n_runs", "n_events", "max_run",
                              "mean_dwell_milli")})


def events_conformal_coverage(sf_dir: str) -> pd.DataFrame:
    """SPLIT-CONFORMAL coverage audit — does the 90% interval
    actually cover 90%? Per event type, the calibration half (even
    event_ids) sets the quantile q_hat of the nonconformity score
    and the test half (odd ids) reports empirical coverage. The
    score stays EXACT by clearing the calibration mean: r = |n_cal*v
    - S_cal| (consistent within a type, the only place it is
    compared), q_hat is the ceil-rank (9*(n_cal+1)+9)//10-th
    smallest calibration score over the bounded (type, parity,
    cents) HISTOGRAM — value-level, so ties resolve identically —
    and coverage = test mass with r <= q_hat in exact bps vs the
    9000 nominal. Histogram partials per block — ZERO row shuffle.
    The ML-serving guarantee check, pure integers."""
    ds = _read(sf_dir, "events",
               columns=["event_id", "event_type", "value"])

    def partial(t: pa.Table) -> pa.Table:
        et = np.asarray(t.column("event_type")).astype(object)
        par = t.column("event_id").to_numpy().astype(np.int64) % 2
        v = np.floor(t.column("value").to_numpy() * 100) \
            .astype(np.int64)
        df = pd.DataFrame({"et": et, "par": par, "v": v})
        g = df.groupby(["et", "par", "v"], as_index=False).size()
        return pa.table({
            "et": pa.array(g["et"], type=pa.string()),
            "par": pa.array(g["par"].to_numpy(np.int64)),
            "v": pa.array(g["v"].to_numpy(np.int64)),
            "c": pa.array(g["size"].to_numpy(np.int64))})

    h = (ds.map_batches(partial, batch_format="pyarrow")
         .to_pandas().groupby(["et", "par", "v"], as_index=False)["c"]
         .sum())
    rows = []
    for et in sorted(h["et"].unique()):
        sub = h[h["et"] == et]
        cal = sub[sub["par"] == 0]
        tst = sub[sub["par"] == 1]
        n_cal = int(cal["c"].sum())
        s_cal = int((cal["v"].to_numpy(np.int64)
                     * cal["c"].to_numpy(np.int64)).sum())
        r_cal = np.abs(n_cal * cal["v"].to_numpy(np.int64) - s_cal)
        order = np.argsort(r_cal, kind="mergesort")
        cw = np.cumsum(cal["c"].to_numpy(np.int64)[order])
        k = (9 * (n_cal + 1) + 9) // 10
        k = min(k, n_cal)
        q_hat = int(r_cal[order][np.searchsorted(cw, k)])
        r_tst = np.abs(n_cal * tst["v"].to_numpy(np.int64) - s_cal)
        n_tst = int(tst["c"].sum())
        cov = int(tst["c"].to_numpy(np.int64)[r_tst <= q_hat].sum())
        rows.append((et, n_cal, n_tst, cov,
                     10000 * cov // n_tst, 9000))
    return pd.DataFrame(rows, columns=[
        "event_type", "n_cal", "n_test", "n_covered",
        "coverage_bps", "nominal_bps"]).astype(
        {c: "int64" for c in ("n_cal", "n_test", "n_covered",
                              "coverage_bps", "nominal_bps")})


def lineitem_cluster_deff(sf_dir: str) -> pd.DataFrame:
    """CLUSTER-SAMPLING DESIGN EFFECT — if you sample ORDERS instead
    of lines, how much information do you lose because lines within
    an order are alike? The survey-statistics pair to
    ``events_neyman_allocation``: one-way ANOVA of quantity with
    orders as groups under the milli-floored-mean integer
    discipline, then the ANOVA intraclass correlation fully
    cross-multiplied as icc_milli = 1000*k*(ssb*dfw - ssw*dfb) //
    (k*ssb*dfw + (n-k)*ssw*dfb) — no MS rational ever formed. One
    ``orderkey % 64`` exchange; buckets emit per-order (n, S, Q)
    rows and the driver closes vectorized at order cardinality. SS
    outputs report // 10^6."""
    ds = _read(sf_dir, "lineitem", columns=["l_orderkey", "l_quantity"])

    def derive(t: pa.Table) -> pa.Table:
        ok = t.column("l_orderkey").to_numpy().astype(np.int64)
        q = np.floor(t.column("l_quantity").to_numpy()) \
            .astype(np.int64)
        u, inv = np.unique(ok, return_inverse=True)
        return pa.table({
            "ok": pa.array(u),
            "n": pa.array(np.bincount(inv, minlength=len(u))
                          .astype(np.int64)),
            "s": pa.array(np.bincount(inv, weights=q,
                                      minlength=len(u))
                          .astype(np.int64)),
            "q2": pa.array(np.bincount(inv, weights=q * q,
                                       minlength=len(u))
                           .astype(np.int64)),
            "bucket": pa.array((u % 64).astype(np.int32))})

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby("ok", as_index=False)[["n", "s", "q2"]].sum()

    per = (ds.map_batches(derive, batch_format="pyarrow")
           .groupby("bucket").map_groups(fold, batch_format="pandas")
           .to_pandas())
    n_g = per["n"].to_numpy(np.int64)
    s_g = per["s"].to_numpy(np.int64)
    q_g = per["q2"].to_numpy(np.int64)
    n = int(n_g.sum())
    k = len(per)
    s_tot = int(s_g.sum())
    mbar = 1000 * s_tot // n
    m_g = 1000 * s_g // n_g
    ssb = int((n_g * (m_g - mbar) * (m_g - mbar)).sum())
    ssw = int((1_000_000 * q_g - 2 * m_g * 1000 * s_g
               + n_g * m_g * m_g).sum())
    dfb, dfw = k - 1, n - k
    num = k * (ssb * dfw - ssw * dfb)
    den = k * ssb * dfw + (n - k) * ssw * dfb
    sgn = 1 if num > 0 else (-1 if num < 0 else 0)
    icc_milli = sgn * (1000 * abs(num) // den)
    mbar_lines_milli = 1000 * n // k
    # sign-normalize: icc can be negative and DuckDB // truncates
    tt = (mbar_lines_milli - 1000) * icc_milli
    sg2 = 1 if tt > 0 else (-1 if tt < 0 else 0)
    deff_milli = 1000 + sg2 * (abs(tt) // 1000)
    return pd.DataFrame([(n, k, ssb // 1_000_000, ssw // 1_000_000,
                          icc_milli, mbar_lines_milli, deff_milli)],
                        columns=["n_lines", "n_orders", "ssb_sc",
                                 "ssw_sc", "icc_milli",
                                 "mean_cluster_milli", "deff_milli"]) \
        .astype("int64")


def embedding_norm2_anova(sf_dir: str) -> pd.DataFrame:
    """SUPERVISED-SCALE audit — do the label classes live at
    different embedding MAGNITUDES? One-way integer ANOVA of the
    squared norm (exact 1e-6 fixed point, scaled // 10^9 so every
    square stays int64 at any block size) across labels under the
    ``orders_dow_anova`` milli-floored-mean discipline: SSB/SSW exact
    Python-bigint/HUGEINT, F and eta^2 close with NO float. A
    significant F here means norm leaks the label — normalize before
    cosine retrieval. Per-block per-label moment partials — ZERO
    shuffle."""
    ds = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet",
                               columns=["embedding", "label"])

    def partial(t: pa.Table) -> pa.Table:
        arr = t.column("embedding").combine_chunks()
        flat = arr.flatten().to_numpy(zero_copy_only=False)
        dim = len(flat) // len(arr)
        fp = np.floor(flat.astype(np.float64) * 1_000_000.0) \
            .astype(np.int64).reshape(-1, dim)
        ns2 = (fp * fp).sum(axis=1) // 1_000_000_000
        lab = t.column("label").to_numpy().astype(np.int64)
        u, inv = np.unique(lab, return_inverse=True)
        k = len(u)
        return pa.table({
            "label": pa.array(u),
            "n": pa.array(np.bincount(inv, minlength=k)
                          .astype(np.int64)),
            "s": pa.array(np.bincount(inv, weights=ns2, minlength=k)
                          .astype(np.int64)),
            "q": pa.array(np.bincount(inv, weights=ns2 * ns2,
                                      minlength=k).astype(np.int64))})

    g = (ds.map_batches(partial, batch_format="pyarrow")
         .to_pandas().groupby("label", as_index=False).sum())
    n = int(g["n"].sum())
    k = len(g)
    s_tot = int(g["s"].sum())
    mbar = 1000 * s_tot // n
    ssb = 0
    ssw = 0
    for _, r in g.iterrows():
        n_i, s_i, q_i = int(r["n"]), int(r["s"]), int(r["q"])
        m_i = 1000 * s_i // n_i
        ssb += n_i * (m_i - mbar) * (m_i - mbar)
        ssw += 1_000_000 * q_i - 2 * m_i * 1000 * s_i \
            + n_i * m_i * m_i
    f_milli = 1000 * ssb * (n - k) // (ssw * (k - 1))
    eta2_bps = 10000 * ssb // (ssb + ssw)
    return pd.DataFrame([(n, k, ssb // 1_000_000, ssw // 1_000_000,
                          f_milli, eta2_bps)],
                        columns=["n_vecs", "n_labels", "ssb_sc",
                                 "ssw_sc", "f_milli", "eta2_bps"]) \
        .astype("int64")


def orders_weekend_ks_dominance(sf_dir: str) -> pd.DataFrame:
    """DIRECTED two-sample KS — does the weekend daily-revenue
    distribution stochastically DOMINATE weekdays (not just differ)?
    Both one-sided sup gaps D+ = max(F_wd - F_we) and D- =
    max(F_we - F_wd) evaluated at every pooled distinct value with
    the CDFs fully cross-multiplied (gap numerators in exact
    1/(n_wd*n_we) units — no rational CDF ever formed), plus the
    two-sided D. D- near zero while D+ is large = weekends dominate
    everywhere, a stronger statement than the two-sided test. Daily
    partials — ZERO shuffle; the value sweep is calendar-sized."""
    ds = _read(sf_dir, "orders", columns=["o_orderdate", "o_totalprice"])

    def partial(t: pa.Table) -> pa.Table:
        dy = t.column("o_orderdate").cast(pa.int64()).to_numpy() \
            // 86_400_000_000
        rev = np.floor(t.column("o_totalprice").to_numpy() * 100) \
            .astype(np.int64)
        u, inv = np.unique(dy, return_inverse=True)
        return pa.table({
            "dy": pa.array(u),
            "cents": pa.array(np.bincount(inv, weights=rev,
                                          minlength=len(u))
                              .astype(np.int64))})

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    agg = parts.groupby("dy", as_index=False)["cents"].sum()
    dy = agg["dy"].to_numpy(np.int64)
    v = agg["cents"].to_numpy(np.int64)
    is_we = ((dy + 3) % 7) >= 5
    n_we = int(is_we.sum())
    n_wd = len(dy) - n_we
    order = np.argsort(v, kind="mergesort")
    vs = v[order]
    we = is_we[order].astype(np.int64)
    cum_we = np.cumsum(we)
    cum_wd = np.cumsum(1 - we)
    last = np.concatenate((vs[1:] != vs[:-1], [True]))
    gap = cum_wd[last] * n_we - cum_we[last] * n_wd
    d_plus = int(gap.max())
    d_minus = int((-gap).max())
    d_two = max(d_plus, d_minus)
    den = n_wd * n_we
    return pd.DataFrame([(n_wd, n_we, d_plus, d_minus,
                          1000 * max(d_plus, 0) // den,
                          1000 * max(d_minus, 0) // den,
                          1000 * d_two // den)],
                        columns=["n_weekday", "n_weekend",
                                 "d_plus_num", "d_minus_num",
                                 "d_plus_milli", "d_minus_milli",
                                 "d_milli"]).astype("int64")


def user_early_signal_corr(sf_dir: str) -> pd.DataFrame:
    """EARLY-SIGNAL correlation — how well does a user's FIRST WEEK
    predict their lifetime activity? Pearson r between events in
    days [first, first+6] and total events, from six exact integer
    moments through ONE user exchange (per-bucket single-row
    partials), the final r as the same IEEE-matched
    CAST-divide-sqrt chain as ``user_split_half_reliability``. The
    growth-team question behind every activation metric. High r =
    week-one engagement is destiny; low r = late bloomers are
    real."""
    import math

    ds = _read(sf_dir, "events", columns=["user_id", "ts"])

    def derive(t: pa.Table) -> pa.Table:
        u = t.column("user_id").to_numpy().astype(np.int64)
        d = t.column("ts").cast(pa.int64()).to_numpy() // _DAY_US
        return pa.table({
            "u": pa.array(u), "d": pa.array(d),
            "bucket": pa.array((u % 64).astype(np.int32))})

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        u = g["u"].to_numpy(np.int64)
        d = g["d"].to_numpy(np.int64)
        uu, inv = np.unique(u, return_inverse=True)
        k = len(uu)
        f = np.full(k, np.iinfo(np.int64).max, np.int64)
        np.minimum.at(f, inv, d)
        tot = np.bincount(inv, minlength=k).astype(np.int64)
        early = np.bincount(inv, weights=(d <= f[inv] + 6),
                            minlength=k).astype(np.int64)
        return pd.DataFrame([{
            "n": k, "sx": int(early.sum()), "sy": int(tot.sum()),
            "sxx": int((early * early).sum()),
            "syy": int((tot * tot).sum()),
            "sxy": int((early * tot).sum())}])

    m = (ds.map_batches(derive, batch_format="pyarrow")
         .groupby("bucket").map_groups(fold, batch_format="pandas")
         .to_pandas().sum())
    n, sx, sy = int(m["n"]), int(m["sx"]), int(m["sy"])
    sxx, syy, sxy = int(m["sxx"]), int(m["syy"]), int(m["sxy"])
    num = n * sxy - sx * sy
    va = n * sxx - sx * sx
    vb = n * syy - sy * sy
    if va > 0 and vb > 0:
        r_milli = math.floor(
            float(num)
            / (math.sqrt(float(va)) * math.sqrt(float(vb)))
            * 1000.0)
    else:
        r_milli = 0
    return pd.DataFrame([(n, sx, sy, num, va, vb, r_milli)],
                        columns=["n_users", "sum_early", "sum_total",
                                 "cov_num", "var_early", "var_total",
                                 "r_milli"]).astype("int64")


def orders_pacf2(sf_dir: str) -> pd.DataFrame:
    """LAG-2 PARTIAL autocorrelation — is there momentum BEYOND what
    yesterday already explains? The AR-order-selection number:
    phi22 = (rho2 - rho1^2)/(1 - rho1^2) stays EXACT by clearing
    every rational — with raw autocovariance numerators c_k =
    sum(y_t * y_{t+k}) over the y = n*x - S demeaned gapfilled
    mega-dollar series, phi22_milli = sign-safe
    1000*(c2*c0 - c1^2) // (c0^2 - c1^2) in Python bigints (HUGEINT
    twin), and rho1/rho2 close as sign-safe milli over c0. Daily
    partials — ZERO shuffle. phi22 ~ 0 = AR(1) is enough."""
    ds = _read(sf_dir, "orders", columns=["o_orderdate", "o_totalprice"])

    def partial(t: pa.Table) -> pa.Table:
        dy = t.column("o_orderdate").cast(pa.int64()).to_numpy() \
            // 86_400_000_000
        rev = np.floor(t.column("o_totalprice").to_numpy() * 100) \
            .astype(np.int64)
        u, inv = np.unique(dy, return_inverse=True)
        return pa.table({
            "dy": pa.array(u),
            "cents": pa.array(np.bincount(inv, weights=rev,
                                          minlength=len(u))
                              .astype(np.int64))})

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    agg = parts.groupby("dy", as_index=False)["cents"].sum()
    days = agg["dy"].to_numpy(np.int64)
    lo, hi = int(days.min()), int(days.max())
    vec = np.zeros(hi - lo + 1, dtype=np.int64)
    vec[days - lo] = agg["cents"].to_numpy(np.int64)
    x = vec // 100_000_000
    n = len(x)
    s = int(x.sum())
    y = n * x - s
    c0 = int(np.dot(y, y))
    c1 = int(np.dot(y[:-1], y[1:]))
    c2 = int(np.dot(y[:-2], y[2:]))

    def sdiv(num, den):
        sgn = 1 if num > 0 else (-1 if num < 0 else 0)
        return sgn * (1000 * abs(num) // den)

    den = c0 * c0 - c1 * c1
    phi22 = sdiv(c2 * c0 - c1 * c1, den) if den > 0 else -9999
    return pd.DataFrame([(n, c0, sdiv(c1, c0), sdiv(c2, c0), phi22)],
                        columns=["n_days", "c0", "rho1_milli",
                                 "rho2_milli", "phi22_milli"]) \
        .astype("int64")


def lineitem_return_trend_ca(sf_dir: str) -> pd.DataFrame:
    """COCHRAN-ARMITAGE trend test — does the RETURN RATE rise
    monotonically with quantity band? The dose-response test for
    binary outcomes, closed entirely in integers: with band scores
    w = (q-1)//10, the trend numerator num = N*sum(w*r_b) -
    R*sum(w*n_b) and the exact variance identity give
    z^2_milli = 1000*num^2*N // (R*(N-R)*(N*sum(n*w^2) -
    (sum(n*w))^2)) — Python bigints / HUGEINT, no rational ever
    formed. Per-band rates ride along in bps. Constant 5x2 grid
    partials per block — ZERO shuffle."""
    ds = _read(sf_dir, "lineitem",
               columns=["l_quantity", "l_returnflag"])

    def partial(t: pa.Table) -> pa.Table:
        q = np.floor(t.column("l_quantity").to_numpy()).astype(np.int64)
        ret = (np.asarray(t.column("l_returnflag")).astype(object)
               == "R").astype(np.int64)
        band = np.clip((q - 1) // 10, 0, 4)
        cell = band * 2 + ret
        c = np.bincount(cell, minlength=10).astype(np.int64)
        return pa.table({"cell": pa.array(np.arange(10,
                                                    dtype=np.int64)),
                         "c": pa.array(c)})

    g = (ds.map_batches(partial, batch_format="pyarrow")
         .to_pandas().groupby("cell")["c"].sum())
    n_b = np.array([int(g.get(b * 2, 0)) + int(g.get(b * 2 + 1, 0))
                    for b in range(5)], dtype=np.int64)
    r_b = np.array([int(g.get(b * 2 + 1, 0)) for b in range(5)],
                   dtype=np.int64)
    w = np.arange(5, dtype=np.int64)
    n = int(n_b.sum())
    r = int(r_b.sum())
    num = n * int((w * r_b).sum()) - r * int((w * n_b).sum())
    den = r * (n - r) * (n * int((n_b * w * w).sum())
                         - int((n_b * w).sum()) ** 2)
    z2_milli = 1000 * num * num * n // den
    rows = [(int(b), int(n_b[b]), int(r_b[b]),
             10000 * int(r_b[b]) // int(n_b[b]), num, z2_milli)
            for b in range(5)]
    return pd.DataFrame(rows, columns=[
        "band", "n_lines", "n_returned", "rate_bps", "trend_num",
        "z2_milli"]).astype("int64")


def lineitem_tax_regressivity(sf_dir: str) -> pd.DataFrame:
    """TAX REGRESSIVITY profile — do SMALL line items pay a higher
    effective tax rate? Effective tax bps per price decile, with the
    deciles cut on the bounded $100-bin histogram (bin = cents //
    10^4, so the rank scan never touches rows) by the exact
    10*cum_prev // N starting-rank rule shared verbatim with the
    twin. Per-bin (n, base-cents, tax-cents) partials — ZERO
    shuffle; tax amounts floor per row identically on both sides.
    The pricing-fairness table, pure integers."""
    ds = _read(sf_dir, "lineitem",
               columns=["l_extendedprice", "l_tax"])

    def partial(t: pa.Table) -> pa.Table:
        ep = np.floor(t.column("l_extendedprice").to_numpy() * 100) \
            .astype(np.int64)
        tax = np.floor(t.column("l_extendedprice").to_numpy()
                       * t.column("l_tax").to_numpy() * 100) \
            .astype(np.int64)
        b = ep // 10000
        u, inv = np.unique(b, return_inverse=True)
        return pa.table({
            "b": pa.array(u),
            "n": pa.array(np.bincount(inv, minlength=len(u))
                          .astype(np.int64)),
            "base": pa.array(np.bincount(inv, weights=ep,
                                         minlength=len(u))
                             .astype(np.int64)),
            "tax": pa.array(np.bincount(inv, weights=tax,
                                        minlength=len(u))
                            .astype(np.int64))})

    g = (ds.map_batches(partial, batch_format="pyarrow")
         .to_pandas().groupby("b", as_index=False).sum()
         .sort_values("b"))
    n_tot = int(g["n"].sum())
    cum_prev = np.cumsum(g["n"].to_numpy(np.int64)) \
        - g["n"].to_numpy(np.int64)
    dec = np.minimum(10 * cum_prev // n_tot, 9)
    g["dec"] = dec
    out = g.groupby("dec", as_index=False)[["n", "base", "tax"]].sum()
    out["eff_tax_bps"] = 10000 * out["tax"].to_numpy(np.int64) \
        // out["base"].to_numpy(np.int64)
    return out.rename(columns={"dec": "decile", "n": "n_lines",
                               "base": "base_cents",
                               "tax": "tax_cents"}).astype("int64")


def lineitem_discount_moy(sf_dir: str) -> pd.DataFrame:
    """DISCOUNT SEASONALITY — mean discount per calendar month of
    year (the promo-calendar fingerprint): exact truncating means in
    basis points over the 12-cell (month-of-year, n, sum-discount-bp)
    grid, with each month's lift vs the annual mean fully
    cross-multiplied as 1000 * S_m * N // (n_m * S) - 1000.
    Month-of-year = months-since-epoch % 12, identical on both
    sides. Per-block 12-cell partials — ZERO shuffle, no float."""
    ds = _read(sf_dir, "lineitem",
               columns=["l_shipdate", "l_discount"])

    def partial(t: pa.Table) -> pa.Table:
        d = t.column("l_shipdate").cast(pa.int64()).to_numpy() \
            // 86_400_000_000
        moy = d.astype("datetime64[D]").astype("datetime64[M]") \
            .astype(np.int64) % 12
        disc = np.floor(t.column("l_discount").to_numpy() * 10000) \
            .astype(np.int64)
        n = np.bincount(moy, minlength=12).astype(np.int64)
        s = np.bincount(moy, weights=disc, minlength=12) \
            .astype(np.int64)
        return pa.table({"moy": pa.array(np.arange(12,
                                                   dtype=np.int64)),
                         "n": pa.array(n), "s": pa.array(s)})

    g = (ds.map_batches(partial, batch_format="pyarrow")
         .to_pandas().groupby("moy", as_index=False).sum())
    n_tot = int(g["n"].sum())
    s_tot = int(g["s"].sum())
    g = g[g["n"] > 0].sort_values("moy").reset_index(drop=True)
    n = g["n"].to_numpy(np.int64)
    s = g["s"].to_numpy(np.int64)
    g["mean_disc_bp"] = s // n
    g["lift_milli"] = [1000 * int(si) * n_tot
                       // (int(ni) * s_tot) - 1000
                       for ni, si in zip(n, s)]
    return g.rename(columns={"n": "n_lines", "s": "sum_disc_bp"}) \
        .astype("int64")


def events_daily_basket_lift(sf_dir: str) -> pd.DataFrame:
    """DAILY-BASKET co-occurrence lift — treating each (user, day) as
    a basket, which event-type PAIRS co-occur beyond independence?
    The affinity the user-grain ``event_type_overlap`` cannot see:
    lift fully cross-multiplied as 1000 * n_ab * N // (n_a * n_b)
    over basket counts, no share rational ever formed. One
    ``basket % 64`` exchange of per-block distinct (basket, type)
    rows; buckets (which own whole baskets) dedup across blocks and
    emit constant-size partials: per-pair counts, per-type counts
    and one basket-count row each. Pure integers."""
    ds = _read(sf_dir, "events", columns=["user_id", "ts",
                                          "event_type"])

    def derive(t: pa.Table) -> pa.Table:
        u = t.column("user_id").to_numpy().astype(np.int64)
        d = t.column("ts").cast(pa.int64()).to_numpy() // _DAY_US
        b = u * 32768 + (d % 32768)
        df = pd.DataFrame({
            "b": b,
            "et": np.asarray(t.column("event_type")).astype(object)})
        df = df.drop_duplicates()
        return pa.table({
            "b": pa.array(df["b"].to_numpy(np.int64)),
            "et": pa.array(df["et"], type=pa.string()),
            "bucket": pa.array((df["b"].to_numpy(np.int64) % 64)
                               .astype(np.int32))})

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates(["b", "et"])
        rows = [("__baskets__", "", int(g["b"].nunique()))]
        sg = g.groupby("et").size()
        rows += [(str(et), "", int(c)) for et, c in sg.items()]
        m = g.merge(g, on="b")
        m = m[m["et_x"] < m["et_y"]]
        pg = m.groupby(["et_x", "et_y"]).size()
        rows += [(str(a), str(bb), int(c))
                 for (a, bb), c in pg.items()]
        return pd.DataFrame(rows, columns=["a", "b2", "n"])

    raw = (ds.map_batches(derive, batch_format="pyarrow")
           .groupby("bucket").map_groups(fold, batch_format="pandas")
           .to_pandas().groupby(["a", "b2"], as_index=False)["n"]
           .sum())
    n_baskets = int(raw.loc[raw["a"] == "__baskets__", "n"].sum())
    singles = {r["a"]: int(r["n"]) for _, r in
               raw[(raw["b2"] == "")
                   & (raw["a"] != "__baskets__")].iterrows()}
    pairs = raw[raw["b2"] != ""].sort_values(["a", "b2"],
                                             kind="mergesort")
    out = []
    for _, r in pairs.iterrows():
        nab = int(r["n"])
        out.append((r["a"], r["b2"], nab, singles[r["a"]],
                    singles[r["b2"]],
                    1000 * nab * n_baskets
                    // (singles[r["a"]] * singles[r["b2"]])))
    return pd.DataFrame(out, columns=["type_a", "type_b", "n_both",
                                      "n_a", "n_b", "lift_milli"]) \
        .astype({c: "int64" for c in ("n_both", "n_a", "n_b",
                                      "lift_milli")})


def lineitem_benford2(sf_dir: str) -> pd.DataFrame:
    """SECOND-DIGIT Benford test — the forensic follow-up to the
    first-digit screen (fraudsters who know Benford-1 still fail
    Benford-2): the second significant digit of extended price vs
    the published Benford-2 expectation (fixed milli constants
    shared verbatim with the twin), chi-square closed per cell as
    the cleared-expectation integer floor 1000*(10000*O_d -
    N*c_d)^2 // (10000*N*c_d) and summed order-free. Digit
    extraction is pure integer (peel to the two leading digits by
    repeated //10). Per-block 10-cell partials — ZERO shuffle."""
    ds = _read(sf_dir, "lineitem", columns=["l_extendedprice"])

    def partial(t: pa.Table) -> pa.Table:
        v = np.floor(t.column("l_extendedprice").to_numpy() * 100) \
            .astype(np.int64)
        v = v[v >= 10]
        while True:
            m = v >= 100
            if not m.any():
                break
            v = np.where(m, v // 10, v)
        d2 = v % 10
        return pa.table({"d": pa.array(np.arange(10,
                                                 dtype=np.int64)),
                         "c": pa.array(np.bincount(d2, minlength=10)
                                       .astype(np.int64))})

    g = (ds.map_batches(partial, batch_format="pyarrow")
         .to_pandas().groupby("d", as_index=False)["c"].sum()
         .sort_values("d").reset_index(drop=True))
    exp_bps = [1197, 1139, 1088, 1043, 1003, 967, 934, 904, 876,
               850]
    n = int(g["c"].sum())
    rows = []
    chi2 = 0
    for d in range(10):
        o = int(g["c"].iloc[d])
        c = exp_bps[d]
        dev = 10000 * o - n * c
        term = 1000 * dev * dev // (10000 * n * c)
        chi2 += term
        rows.append((d, o, 10000 * o // n, c, term))
    df = pd.DataFrame(rows, columns=["digit", "n_obs", "obs_bps",
                                     "exp_bps", "term_milli"])
    df["chi2_milli"] = chi2
    return df.astype("int64")


def events_hour_drift(sf_dir: str) -> pd.DataFrame:
    """CIRCULAR DRIFT of the diurnal cycle — did the daily load
    pattern ROTATE between the calendar halves (a timezone mix
    shift, a geography change)? Each half's hour-of-day resultant
    vector folds on the same FIXED integer trig lattice as the
    Rayleigh test (literal constants, no libm); the drift readout is
    the cosine between the two resultants — ONE IEEE-order-matched
    float chain — plus each half's peak lattice hour under the
    (dot desc, hour asc) rule. A tiny span pre-pass anchors the
    halves; per-block 48-cell partials — ZERO shuffle."""
    import math

    ds = _read(sf_dir, "events", columns=["ts"])

    def span(t: pa.Table) -> pa.Table:
        d = t.column("ts").cast(pa.int64()).to_numpy() // _DAY_US
        return pa.table({"lo": pa.array([np.int64(d.min())]),
                         "hi": pa.array([np.int64(d.max())])})

    sp = ds.map_batches(span, batch_format="pyarrow").to_pandas()
    mid = (int(sp["lo"].min()) + int(sp["hi"].max())) // 2

    def partial(t: pa.Table) -> pa.Table:
        us = t.column("ts").cast(pa.int64()).to_numpy()
        hr = (us // 3_600_000_000) % 24
        hf = (us // _DAY_US > mid).astype(np.int64)
        cell = hf * 24 + hr
        cnt = np.bincount(cell, minlength=48).astype(np.int64)
        return pa.table({"cell": pa.array(np.arange(48,
                                                    dtype=np.int64)),
                         "n": pa.array(cnt)})

    agg = (ds.map_batches(partial, batch_format="pyarrow")
           .to_pandas().groupby("cell")["n"].sum())
    res = []
    for hf in (0, 1):
        c = [int(agg.get(hf * 24 + h, 0)) for h in range(24)]
        n = sum(c)
        sx = sum(a * int(b) for a, b in zip(c, _HOUR_COS))
        sy = sum(a * int(b) for a, b in zip(c, _HOUR_SIN))
        dots = [(int(_HOUR_COS[h]) * sx + int(_HOUR_SIN[h]) * sy, -h)
                for h in range(24)]
        res.append((n, sx, sy, -max(dots)[1]))
    (n0, sx0, sy0, p0), (n1, sx1, sy1, p1) = res
    num = sx0 * sx1 + sy0 * sy1
    d0 = sx0 * sx0 + sy0 * sy0
    d1 = sx1 * sx1 + sy1 * sy1
    cos_milli = math.floor(
        float(num) / (math.sqrt(float(d0)) * math.sqrt(float(d1)))
        * 1000.0)
    return pd.DataFrame([(n0, n1, p0, p1, cos_milli)],
                        columns=["n_first", "n_second", "peak_h0",
                                 "peak_h1", "cos_milli"]) \
        .astype("int64")


def user_pareto_8020(sf_dir: str) -> pd.DataFrame:
    """PARETO 80/20 check — what share of events do the top 20% (and
    top 1%) of users actually carry? The folk rule made exact: users
    rank under the (count desc, user asc) total order, prefix cuts
    at the ceil-rank k = ceil(n/5) and ceil(n/100), shares in exact
    bps. Per-user counts fold map-side at user cardinality; the rank
    scan is one driver sort. Pure integers — the
    concentration-at-a-glance companion to the per-type Gini."""
    ds = _read(sf_dir, "events", columns=["user_id"])

    def partial(t: pa.Table) -> pa.Table:
        u = t.column("user_id").to_numpy().astype(np.int64)
        uu, cnt = np.unique(u, return_counts=True)
        return pa.table({"u": pa.array(uu),
                         "c": pa.array(cnt.astype(np.int64))})

    per = (ds.map_batches(partial, batch_format="pyarrow")
           .to_pandas().groupby("u", as_index=False).sum())
    u = per["u"].to_numpy(np.int64)
    c = per["c"].to_numpy(np.int64)
    order = np.lexsort((u, -c))
    cs = c[order]
    n_users = len(cs)
    tot = int(cs.sum())
    k20 = (n_users + 4) // 5
    k1 = (n_users + 99) // 100
    s20 = int(cs[:k20].sum())
    s1 = int(cs[:k1].sum())
    return pd.DataFrame([(n_users, tot, k20, s20,
                          10000 * s20 // tot, k1, s1,
                          10000 * s1 // tot)],
                        columns=["n_users", "n_events", "k20",
                                 "top20_events", "top20_bps", "k1",
                                 "top1_events", "top1_bps"]) \
        .astype("int64")


def brand_type_coverage(sf_dir: str) -> pd.DataFrame:
    """ASSORTMENT-GAP census — of the brand x type grid, how many
    cells does the catalog actually fill? Occupied cells, hole share
    in exact bps, and the mean parts per occupied cell in milli —
    the range-planning number that decides whether a recommender can
    backfill from a sibling brand. Per-block distinct (brand, type)
    pair partials — grid-sized, ZERO shuffle, pure integers."""
    ds = _read(sf_dir, "part", columns=["p_brand", "p_type"])

    def partial(t: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "br": np.asarray(t.column("p_brand")).astype(object),
            "ty": np.asarray(t.column("p_type")).astype(object)})
        g = df.groupby(["br", "ty"], as_index=False).size()
        return pa.table({
            "br": pa.array(g["br"], type=pa.string()),
            "ty": pa.array(g["ty"], type=pa.string()),
            "n": pa.array(g["size"].to_numpy(np.int64))})

    g = (ds.map_batches(partial, batch_format="pyarrow")
         .to_pandas().groupby(["br", "ty"], as_index=False)["n"]
         .sum())
    nb = g["br"].nunique()
    nt = g["ty"].nunique()
    occ = len(g)
    total = int(g["n"].sum())
    possible = nb * nt
    return pd.DataFrame([(nb, nt, possible, occ, possible - occ,
                          10000 * occ // possible,
                          1000 * total // occ)],
                        columns=["n_brands", "n_types", "n_possible",
                                 "n_occupied", "n_holes",
                                 "occupied_bps",
                                 "mean_per_cell_milli"]) \
        .astype("int64")


def part_price_points(sf_dir: str) -> pd.DataFrame:
    """PRICE-POINT adherence — the top-10 exact retail price points
    by part count (ties to the lower price): how concentrated is the
    catalog on anchor prices, and what share do the anchors carry
    (in exact bps)? The pricing-ops census behind every "ends in
    .99" policy audit. Per-block (cents, n) partials fold at
    distinct-price cardinality — ZERO shuffle, pure integers."""
    ds = _read(sf_dir, "part", columns=["p_retailprice"])

    def partial(t: pa.Table) -> pa.Table:
        v = np.floor(t.column("p_retailprice").to_numpy() * 100) \
            .astype(np.int64)
        u, cnt = np.unique(v, return_counts=True)
        return pa.table({"cents": pa.array(u),
                         "n": pa.array(cnt.astype(np.int64))})

    g = (ds.map_batches(partial, batch_format="pyarrow")
         .to_pandas().groupby("cents", as_index=False)["n"].sum())
    tot = int(g["n"].sum())
    c = g["cents"].to_numpy(np.int64)
    n = g["n"].to_numpy(np.int64)
    order = np.lexsort((c, -n))[:10]
    return pd.DataFrame({
        "rk": np.arange(1, len(order) + 1, dtype=np.int64),
        "cents": c[order], "n_parts": n[order],
        "share_bps": 10000 * n[order] // tot}).astype("int64")


def user_decile_migration(sf_dir: str) -> pd.DataFrame:
    """VALUE-DECILE migration — do users stay in their spending
    decile between calendar halves, and how far do movers move? For
    users active in BOTH halves, the per-half decile comes from the
    exact starting-rank rule 10*(rank-1)//n under the (value desc,
    user asc) total order (shared verbatim with the twin's window),
    and each from-decile reports its stayer share in bps and the
    mean |decile move| in milli. The churn-model feature-stability
    check. Per-block (user, half) value partials fold at user
    cardinality; the rank scan is one driver sort. Pure integers."""
    ds = _read(sf_dir, "events", columns=["user_id", "ts", "value"])

    def span(t: pa.Table) -> pa.Table:
        d = t.column("ts").cast(pa.int64()).to_numpy() // _DAY_US
        return pa.table({"lo": pa.array([np.int64(d.min())]),
                         "hi": pa.array([np.int64(d.max())])})

    sp = ds.map_batches(span, batch_format="pyarrow").to_pandas()
    mid = (int(sp["lo"].min()) + int(sp["hi"].max())) // 2

    def partial(t: pa.Table) -> pa.Table:
        u = t.column("user_id").to_numpy().astype(np.int64)
        d = t.column("ts").cast(pa.int64()).to_numpy() // _DAY_US
        v = np.floor(t.column("value").to_numpy() * 100) \
            .astype(np.int64)
        key = u * 2 + (d > mid)
        ku, inv = np.unique(key, return_inverse=True)
        return pa.table({
            "key": pa.array(ku),
            "v": pa.array(np.bincount(inv, weights=v,
                                      minlength=len(ku))
                          .astype(np.int64))})

    per = (ds.map_batches(partial, batch_format="pyarrow")
           .to_pandas().groupby("key", as_index=False).sum())
    key = per["key"].to_numpy(np.int64)
    val = per["v"].to_numpy(np.int64)

    def deciles(half):
        m = key % 2 == half
        u = key[m] // 2
        v = val[m]
        order = np.lexsort((u, -v))
        n = len(u)
        dec = 10 * np.arange(n, dtype=np.int64) // n
        return dict(zip(u[order].tolist(), dec.tolist()))

    d0 = deciles(0)
    d1 = deciles(1)
    both = sorted(set(d0) & set(d1))
    f = np.array([d0[u] for u in both], dtype=np.int64)
    t_ = np.array([d1[u] for u in both], dtype=np.int64)
    rows = []
    for dec in np.unique(f):
        m = f == dec
        n = int(m.sum())
        stay = int((t_[m] == dec).sum())
        move = int(np.abs(t_[m] - dec).sum())
        rows.append((int(dec), n, 10000 * stay // n,
                     1000 * move // n))
    return pd.DataFrame(rows, columns=["from_decile", "n_users",
                                       "stay_bps",
                                       "mean_abs_move_milli"]) \
        .astype("int64")


def events_weekend_mix_shift(sf_dir: str) -> pd.DataFrame:
    """WEEKEND MIX SHIFT — how does the event-type mix rotate on
    weekends? Per type, weekday and weekend shares in exact bps and
    the shift fully cross-multiplied as
    1000 * n_we_t * N_wd // (n_wd_t * N_we) - 1000 (positive =
    over-indexes on weekends), no share rational ever formed. The
    staffing / cache-warming mix planner. Per-block (type, is_we)
    count partials — constant cells, ZERO shuffle."""
    ds = _read(sf_dir, "events", columns=["ts", "event_type"])

    def partial(t: pa.Table) -> pa.Table:
        d = t.column("ts").cast(pa.int64()).to_numpy() // _DAY_US
        we = ((d + 3) % 7 >= 5).astype(np.int64)
        et = np.asarray(t.column("event_type")).astype(object)
        df = pd.DataFrame({"et": et, "we": we})
        g = df.groupby(["et", "we"], as_index=False).size()
        return pa.table({
            "et": pa.array(g["et"], type=pa.string()),
            "we": pa.array(g["we"].to_numpy(np.int64)),
            "n": pa.array(g["size"].to_numpy(np.int64))})

    g = (ds.map_batches(partial, batch_format="pyarrow")
         .to_pandas().groupby(["et", "we"], as_index=False)["n"]
         .sum())
    wd = {r["et"]: int(r["n"]) for _, r in g[g["we"] == 0].iterrows()}
    we = {r["et"]: int(r["n"]) for _, r in g[g["we"] == 1].iterrows()}
    n_wd = sum(wd.values())
    n_we = sum(we.values())
    rows = []
    for et in sorted(set(wd) | set(we)):
        a = wd.get(et, 0)
        b = we.get(et, 0)
        shift = (1000 * b * n_wd // (a * n_we) - 1000
                 if a > 0 and n_we > 0 else -9999)
        rows.append((et, a, b, 10000 * a // n_wd,
                     10000 * b // n_we, shift))
    return pd.DataFrame(rows, columns=[
        "event_type", "n_weekday", "n_weekend", "wd_share_bps",
        "we_share_bps", "shift_milli"]).astype(
        {c: "int64" for c in ("n_weekday", "n_weekend",
                              "wd_share_bps", "we_share_bps",
                              "shift_milli")})


def user_night_owl_census(sf_dir: str) -> pd.DataFrame:
    """NIGHT-OWL census — users banded by their NIGHT share (hours
    22-05) of activity: the behavioral-axis complement to the
    weekday habit bands (send-window and abuse-screen input). Bands:
    sparse (< 7 events), then night share < 10% / < 30% / < 60% /
    >= 60% in exact bps. One ``user % 64`` exchange of per-block
    (user, is_night) count partials; buckets emit one 5-cell
    histogram row each. Pure integers."""
    ds = _read(sf_dir, "events", columns=["user_id", "ts"])

    def derive(t: pa.Table) -> pa.Table:
        u = t.column("user_id").to_numpy().astype(np.int64)
        hr = (t.column("ts").cast(pa.int64()).to_numpy()
              // 3_600_000_000) % 24
        night = ((hr >= 22) | (hr < 6)).astype(np.int64)
        key = u * 2 + night
        ku, cnt = np.unique(key, return_counts=True)
        return pa.table({
            "u": pa.array(ku // 2),
            "ni": pa.array(ku % 2),
            "c": pa.array(cnt.astype(np.int64)),
            "bucket": pa.array(((ku // 2) % 64).astype(np.int32))})

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        key = g["u"].to_numpy(np.int64) * 2 + g["ni"].to_numpy(np.int64)
        ku, inv = np.unique(key, return_inverse=True)
        c = np.bincount(inv, weights=g["c"].to_numpy(np.int64),
                        minlength=len(ku)).astype(np.int64)
        uu, uinv = np.unique(ku // 2, return_inverse=True)
        tot = np.bincount(uinv, weights=c, minlength=len(uu)) \
            .astype(np.int64)
        nn = np.bincount(uinv, weights=c * (ku % 2),
                         minlength=len(uu)).astype(np.int64)
        share = 10000 * nn // tot
        band = np.where(tot < 7, 0,
                        np.where(share < 1000, 1,
                                 np.where(share < 3000, 2,
                                          np.where(share < 6000, 3,
                                                   4))))
        h = np.bincount(band, minlength=5).astype(np.int64)
        return pd.DataFrame({"band": np.arange(5, dtype=np.int64),
                             "n_users": h})

    g = (ds.map_batches(derive, batch_format="pyarrow")
         .groupby("bucket").map_groups(fold, batch_format="pandas")
         .to_pandas().groupby("band", as_index=False).sum())
    tot = int(g["n_users"].sum())
    g = g[g["n_users"] > 0].sort_values("band").reset_index(drop=True)
    g["share_bps"] = 10000 * g["n_users"].to_numpy(np.int64) // tot
    return g.astype("int64")


def orders_status_year_mix(sf_dir: str) -> pd.DataFrame:
    """ORDER-STATUS mix by year — the lifecycle drift table (an
    aging book shows F crowding out O in later years): per (year,
    status) counts with within-year shares in exact bps and each
    cell's lift vs the all-years status mix fully cross-multiplied
    as 1000 * n_ys * N // (n_y * n_s) - 1000. Years via
    datediff-year on both sides. Per-block (year, status) grid
    partials — ZERO shuffle, pure integers."""
    ds = _read(sf_dir, "orders",
               columns=["o_orderdate", "o_orderstatus"])

    def partial(t: pa.Table) -> pa.Table:
        d = t.column("o_orderdate").cast(pa.int64()).to_numpy() \
            // 86_400_000_000
        yr = (d.astype("datetime64[D]").astype("datetime64[Y]")
              .astype(np.int64)) + 1970
        st = np.asarray(t.column("o_orderstatus")).astype(object)
        df = pd.DataFrame({"yr": yr, "st": st})
        g = df.groupby(["yr", "st"], as_index=False).size()
        return pa.table({
            "yr": pa.array(g["yr"].to_numpy(np.int64)),
            "st": pa.array(g["st"], type=pa.string()),
            "n": pa.array(g["size"].to_numpy(np.int64))})

    g = (ds.map_batches(partial, batch_format="pyarrow")
         .to_pandas().groupby(["yr", "st"], as_index=False)["n"]
         .sum())
    ny = g.groupby("yr")["n"].sum().to_dict()
    ns = g.groupby("st")["n"].sum().to_dict()
    n_tot = int(g["n"].sum())
    g = g.sort_values(["yr", "st"], kind="mergesort") \
        .reset_index(drop=True)
    g["year_share_bps"] = [10000 * int(r["n"]) // int(ny[r["yr"]])
                           for _, r in g.iterrows()]
    g["lift_milli"] = [1000 * int(r["n"]) * n_tot
                       // (int(ny[r["yr"]]) * int(ns[r["st"]]))
                       - 1000 for _, r in g.iterrows()]
    return g.rename(columns={"yr": "year", "st": "status"}).astype(
        {c: "int64" for c in ("year", "n", "year_share_bps",
                              "lift_milli")})


def brand_return_stdres(sf_dir: str) -> pd.DataFrame:
    """RETURN-RATE residuals by brand — which brands get returned
    MORE than the grand rate predicts? Haberman standardized
    residuals over the brand x returned 25x2 grid (the quality-
    control sibling of the nation/segment grids): exact integer
    deviations N*O - r*c, each cell's residual floored independently
    from ONE IEEE-matched float (never summed), top 10 by |stdres|
    with the (brand, returned) lexical tie rule. Part->brand LUT
    broadcast; per-block grid partials — ZERO row shuffle."""
    import math
    import ray

    part = _read(sf_dir, "part",
                 columns=["p_partkey", "p_brand"]).to_pandas()
    bcode, buniq = pd.factorize(part["p_brand"], sort=True)
    pk = part["p_partkey"].to_numpy(np.int64)
    p_br = np.zeros(pk.max() + 1, dtype=np.int64)
    p_br[pk] = bcode
    nb = len(buniq)
    ref = ray.put(p_br)

    ds = _read(sf_dir, "lineitem",
               columns=["l_partkey", "l_returnflag"])

    def partial(t: pa.Table) -> pa.Table:
        p_br_ = ray.get(ref)
        br = p_br_[t.column("l_partkey").to_numpy().astype(np.int64)]
        ret = (np.asarray(t.column("l_returnflag")).astype(object)
               == "R").astype(np.int64)
        cell = br * 2 + ret
        c = np.bincount(cell, minlength=nb * 2).astype(np.int64)
        return pa.table({
            "cell": pa.array(np.arange(nb * 2, dtype=np.int64)),
            "c": pa.array(c)})

    g = (ds.map_batches(partial, batch_format="pyarrow")
         .to_pandas().groupby("cell")["c"].sum())
    grid = np.zeros(nb * 2, dtype=np.int64)
    grid[g.index.to_numpy()] = g.to_numpy()
    grid = grid.reshape(nb, 2)
    n = int(grid.sum())
    rtot = grid.sum(axis=1)
    ctot = grid.sum(axis=0)
    cells = []
    for b in range(nb):
        if int(rtot[b]) == 0:
            continue
        for j in range(2):
            o = int(grid[b, j])
            r = int(rtot[b])
            c = int(ctot[j])
            dev = n * o - r * c
            sr = math.floor(
                (float(dev) / float(n))
                / math.sqrt(float(r * c) / float(n)
                            * (1.0 - float(r) / float(n))
                            * (1.0 - float(c) / float(n)))
                * 1000.0)
            cells.append((str(buniq[b]), j, o, r, c, dev, sr))
    cells.sort(key=lambda x: (-abs(x[6]), x[0], x[1]))
    df = pd.DataFrame(cells[:10], columns=[
        "brand", "returned", "obs", "r_tot", "c_tot", "dev_num",
        "stdres_milli"])
    df["rk"] = np.arange(1, len(df) + 1, dtype=np.int64)
    return df.astype({c: "int64" for c in (
        "returned", "obs", "r_tot", "c_tot", "dev_num",
        "stdres_milli", "rk")})


def order_line_concentration(sf_dir: str) -> pd.DataFrame:
    """WITHIN-ORDER concentration — is an order many balanced lines
    or one dominant line plus filler? Orders band by their TOP
    line's revenue share (<25% / <50% / <80% / >=80%, single-line
    orders separate), decided by the cross-multiplied integer
    compare 100*max_rev vs k*total_rev — no share rational. One
    ``orderkey % 64`` exchange; buckets fold per-order max/sum
    vectorized (lexsort + maximum.at) and emit one 5-cell histogram
    row each. The basket-structure census a bundling strategy reads.
    Pure integers."""
    ds = _read(sf_dir, "lineitem",
               columns=["l_orderkey", "l_extendedprice", "l_discount"])

    def derive(t: pa.Table) -> pa.Table:
        ok = t.column("l_orderkey").to_numpy().astype(np.int64)
        rev = np.floor(t.column("l_extendedprice").to_numpy()
                       * (1 - t.column("l_discount").to_numpy())
                       * 100).astype(np.int64)
        return pa.table({
            "ok": pa.array(ok), "rev": pa.array(rev),
            "bucket": pa.array((ok % 64).astype(np.int32))})

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        ok = g["ok"].to_numpy(np.int64)
        rev = g["rev"].to_numpy(np.int64)
        u, inv = np.unique(ok, return_inverse=True)
        n = np.bincount(inv, minlength=len(u)).astype(np.int64)
        s = np.bincount(inv, weights=rev, minlength=len(u)) \
            .astype(np.int64)
        mx = np.zeros(len(u), np.int64)
        np.maximum.at(mx, inv, rev)
        band = np.where(n == 1, 0,
                        np.where(100 * mx < 25 * s, 1,
                                 np.where(100 * mx < 50 * s, 2,
                                          np.where(100 * mx < 80 * s,
                                                   3, 4))))
        h = np.bincount(band, minlength=5).astype(np.int64)
        return pd.DataFrame({"band": np.arange(5, dtype=np.int64),
                             "n_orders": h})

    g = (ds.map_batches(derive, batch_format="pyarrow")
         .groupby("bucket").map_groups(fold, batch_format="pandas")
         .to_pandas().groupby("band", as_index=False).sum())
    tot = int(g["n_orders"].sum())
    g = g[g["n_orders"] > 0].sort_values("band").reset_index(drop=True)
    g["share_bps"] = 10000 * g["n_orders"].to_numpy(np.int64) // tot
    return g.astype("int64")


def whale_geography(sf_dir: str) -> pd.DataFrame:
    """WHALE GEOGRAPHY — are the top-decile customers concentrated in
    particular nations? Top decile by lifetime order value under the
    exact 10*(rank-1)//n starting-rank rule and the (value desc,
    custkey asc) total order; per nation, whale count vs customer
    base with the over-representation lift fully cross-multiplied as
    1000 * w_n * C // (c_n * W). Per-customer value folds map-side;
    nation rides the dimension LUT; the rank scan is one driver
    sort. The market-prioritization table, pure integers."""
    cust = _read(sf_dir, "customer",
                 columns=["c_custkey", "c_nationkey"]).to_pandas()
    ck = cust["c_custkey"].to_numpy(np.int64)
    c_nat = np.zeros(ck.max() + 1, dtype=np.int64)
    c_nat[ck] = cust["c_nationkey"].to_numpy(np.int64)

    ds = _read(sf_dir, "orders", columns=["o_custkey", "o_totalprice"])

    def partial(t: pa.Table) -> pa.Table:
        c = t.column("o_custkey").to_numpy().astype(np.int64)
        cents = np.floor(t.column("o_totalprice").to_numpy() * 100) \
            .astype(np.int64)
        u, inv = np.unique(c, return_inverse=True)
        return pa.table({
            "ck": pa.array(u),
            "v": pa.array(np.bincount(inv, weights=cents,
                                      minlength=len(u))
                          .astype(np.int64))})

    per = (ds.map_batches(partial, batch_format="pyarrow")
           .to_pandas().groupby("ck", as_index=False).sum())
    u = per["ck"].to_numpy(np.int64)
    v = per["v"].to_numpy(np.int64)
    order = np.lexsort((u, -v))
    n = len(u)
    dec = 10 * np.arange(n, dtype=np.int64) // n
    whale = u[order][dec == 0]
    nk_all = c_nat[u]
    nk_wh = c_nat[whale]
    c_n = np.bincount(nk_all, minlength=25).astype(np.int64)
    w_n = np.bincount(nk_wh, minlength=25).astype(np.int64)
    c_tot = int(c_n.sum())
    w_tot = int(w_n.sum())
    rows = []
    for nk in np.flatnonzero(c_n > 0):
        lift = (1000 * int(w_n[nk]) * c_tot
                // (int(c_n[nk]) * w_tot)) - 1000
        rows.append((int(nk), int(c_n[nk]), int(w_n[nk]),
                     10000 * int(w_n[nk]) // int(c_n[nk]), lift))
    return pd.DataFrame(rows, columns=[
        "c_nationkey", "n_customers", "n_whales", "whale_bps",
        "lift_milli"]).astype("int64")


def supplier_brand_specialization(sf_dir: str) -> pd.DataFrame:
    """SPECIALIST-vs-GENERALIST census — how many EFFECTIVE brands
    does each supplier actually ship? The inverse-Simpson effective
    count n_eff = S^2 / sum(c_b^2) stays division-free: band cuts
    (< 2 / < 5 / < 10 / >= 10 effective brands) are the
    cross-multiplied compares S^2 < k * sum(c^2). Bounded
    (supplier, brand) cell partials fold at supplier x 25
    cardinality with the part->brand LUT broadcast — ZERO row
    shuffle. The sourcing-mix census behind vendor consolidation."""
    import ray

    part = _read(sf_dir, "part",
                 columns=["p_partkey", "p_brand"]).to_pandas()
    bcode, buniq = pd.factorize(part["p_brand"], sort=True)
    pk = part["p_partkey"].to_numpy(np.int64)
    p_br = np.zeros(pk.max() + 1, dtype=np.int64)
    p_br[pk] = bcode
    ref = ray.put(p_br)

    ds = _read(sf_dir, "lineitem", columns=["l_suppkey", "l_partkey"])

    def partial(t: pa.Table) -> pa.Table:
        p_br_ = ray.get(ref)
        sk = t.column("l_suppkey").to_numpy().astype(np.int64)
        br = p_br_[t.column("l_partkey").to_numpy().astype(np.int64)]
        key = sk * 32 + br
        u, cnt = np.unique(key, return_counts=True)
        return pa.table({"key": pa.array(u),
                         "c": pa.array(cnt.astype(np.int64))})

    g = (ds.map_batches(partial, batch_format="pyarrow")
         .to_pandas().groupby("key", as_index=False).sum())
    sk = g["key"].to_numpy(np.int64) // 32
    c = g["c"].to_numpy(np.int64)
    su, sinv = np.unique(sk, return_inverse=True)
    s_tot = np.bincount(sinv, weights=c, minlength=len(su)) \
        .astype(np.int64)
    c2 = np.bincount(sinv, weights=c * c, minlength=len(su)) \
        .astype(np.int64)
    s2 = s_tot * s_tot
    band = np.where(s2 < 2 * c2, 0,
                    np.where(s2 < 5 * c2, 1,
                             np.where(s2 < 10 * c2, 2, 3)))
    tot = len(su)
    rows = []
    names = ["lt2", "2to5", "5to10", "ge10"]
    for b in range(4):
        m = band == b
        if not m.any():
            continue
        rows.append((b, names[b], int(m.sum()),
                     10000 * int(m.sum()) // tot,
                     int(s_tot[m].sum())))
    return pd.DataFrame(rows, columns=[
        "band", "label", "n_suppliers", "share_bps", "n_lines"]) \
        .astype({c: "int64" for c in ("band", "n_suppliers",
                                      "share_bps", "n_lines")})


def orders_yearly_customer_hhi(sf_dir: str) -> pd.DataFrame:
    """CONCENTRATION DRIFT — is revenue concentrating into fewer
    customers year over year? Per year: active customers, the exact
    customer-revenue HHI in bps (10^8-cleared: hhi_bps =
    10000 * sum(x_c^2) // T^2, Python bigints / HUGEINT) and the
    CR10 share under the (revenue desc, custkey) order. The
    account-risk trend a CFO tracks. Per-block (year, customer)
    revenue partials fold at year x customer cardinality; the rank
    scan runs per year on the driver. Pure integers."""
    ds = _read(sf_dir, "orders",
               columns=["o_custkey", "o_orderdate", "o_totalprice"])

    def partial(t: pa.Table) -> pa.Table:
        d = t.column("o_orderdate").cast(pa.int64()).to_numpy() \
            // 86_400_000_000
        yr = d.astype("datetime64[D]").astype("datetime64[Y]") \
            .astype(np.int64) + 1970
        ck = t.column("o_custkey").to_numpy().astype(np.int64)
        cents = np.floor(t.column("o_totalprice").to_numpy() * 100) \
            .astype(np.int64)
        key = yr * 1_000_000 + ck
        u, inv = np.unique(key, return_inverse=True)
        return pa.table({
            "key": pa.array(u),
            "v": pa.array(np.bincount(inv, weights=cents,
                                      minlength=len(u))
                          .astype(np.int64))})

    g = (ds.map_batches(partial, batch_format="pyarrow")
         .to_pandas().groupby("key", as_index=False).sum())
    yr = g["key"].to_numpy(np.int64) // 1_000_000
    ck = g["key"].to_numpy(np.int64) % 1_000_000
    v = g["v"].to_numpy(np.int64)
    rows = []
    for y in np.unique(yr):
        m = yr == y
        x = v[m]
        cks = ck[m]
        t = int(x.sum())
        s2 = sum(int(a) * int(a) for a in x)
        hhi = 10000 * s2 // (t * t)
        order = np.lexsort((cks, -x))[:10]
        cr10 = 10000 * int(x[order].sum()) // t
        rows.append((int(y), int(m.sum()), t, hhi, cr10))
    return pd.DataFrame(rows, columns=[
        "year", "n_customers", "total_cents", "hhi_bps",
        "cr10_bps"]).astype("int64")


def customer_balance_revenue_corr(sf_dir: str) -> pd.DataFrame:
    """STORED-BALANCE validity — does the account-balance column
    actually track realized customer revenue? Pearson r between
    c_acctbal (cents) and lifetime order value from six exact
    integer moments (the dimension joins the fact fold driver-side
    at customer cardinality), closed by the standard IEEE-matched
    CAST-divide-sqrt chain. Low r = the balance column is
    decorative; treat models that consume it accordingly. Customers
    with zero orders join at value 0 — the base is the customer
    dimension."""
    import math

    cust = _read(sf_dir, "customer",
                 columns=["c_custkey", "c_acctbal"]).to_pandas()
    ds = _read(sf_dir, "orders", columns=["o_custkey", "o_totalprice"])

    def partial(t: pa.Table) -> pa.Table:
        c = t.column("o_custkey").to_numpy().astype(np.int64)
        cents = np.floor(t.column("o_totalprice").to_numpy() * 100) \
            .astype(np.int64)
        u, inv = np.unique(c, return_inverse=True)
        return pa.table({
            "ck": pa.array(u),
            "v": pa.array(np.bincount(inv, weights=cents,
                                      minlength=len(u))
                          .astype(np.int64))})

    per = (ds.map_batches(partial, batch_format="pyarrow")
           .to_pandas().groupby("ck", as_index=False).sum())
    val = dict(zip(per["ck"].tolist(), per["v"].tolist()))
    x = np.floor(cust["c_acctbal"].to_numpy() * 100).astype(np.int64)
    y = np.array([int(val.get(int(c), 0))
                  for c in cust["c_custkey"]], dtype=np.int64)
    n = len(x)
    sx, sy = int(x.sum()), int(y.sum())
    sxx = sum(int(a) * int(a) for a in x)
    syy = sum(int(a) * int(a) for a in y)
    sxy = sum(int(a) * int(b) for a, b in zip(x, y))
    num = n * sxy - sx * sy
    va = n * sxx - sx * sx
    vb = n * syy - sy * sy
    r_milli = (math.floor(
        float(num) / (math.sqrt(float(va)) * math.sqrt(float(vb)))
        * 1000.0) if va > 0 and vb > 0 else 0)
    # moment columns exceed int64 at scale: report // 10^9 (r uses
    # the unscaled Python ints above)
    sgn = 1 if num > 0 else (-1 if num < 0 else 0)
    return pd.DataFrame([(n, sgn * (abs(num) // 10 ** 9),
                          va // 10 ** 9, vb // 10 ** 9, r_milli)],
                        columns=["n_customers", "cov_num_sc",
                                 "var_balance_sc", "var_revenue_sc",
                                 "r_milli"]).astype("int64")


def part_type_size_price_census(sf_dir: str) -> pd.DataFrame:
    """PER-TYPE size-price relationship census — within each part
    type, does a bigger size command a higher price? The per-entity
    regression-sign pattern at type grain, division-free: per type
    the covariance numerator n*sum(xy) - sum(x)*sum(y) decides
    up / flat / down (the denominator is positive), and the census
    reports band counts with shares in bps (types with < 3 parts
    gated to 'few'). Per-block per-type 4-moment partials — type
    cardinality, ZERO shuffle, pure integers."""
    ds = _read(sf_dir, "part",
               columns=["p_type", "p_size", "p_retailprice"])

    def partial(t: pa.Table) -> pa.Table:
        ty = np.asarray(t.column("p_type")).astype(object)
        x = t.column("p_size").to_numpy().astype(np.int64)
        y = np.floor(t.column("p_retailprice").to_numpy() * 100) \
            .astype(np.int64)
        code, uniq = pd.factorize(ty)
        k = len(uniq)
        return pa.table({
            "ty": pa.array(uniq.astype(str), type=pa.string()),
            "n": pa.array(np.bincount(code, minlength=k)
                          .astype(np.int64)),
            "sx": pa.array(np.bincount(code, weights=x, minlength=k)
                           .astype(np.int64)),
            "sy": pa.array(np.bincount(code, weights=y, minlength=k)
                           .astype(np.int64)),
            "sxy": pa.array(np.bincount(code, weights=x * y,
                                        minlength=k)
                            .astype(np.int64))})

    g = (ds.map_batches(partial, batch_format="pyarrow")
         .to_pandas().groupby("ty", as_index=False).sum())
    n = g["n"].to_numpy(np.int64)
    num = n * g["sxy"].to_numpy(np.int64) \
        - g["sx"].to_numpy(np.int64) * g["sy"].to_numpy(np.int64)
    band = np.where(n < 3, 0,
                    np.where(num > 0, 1, np.where(num < 0, 3, 2)))
    tot = len(g)
    rows = []
    names = ["few", "up", "flat", "down"]
    for b in range(4):
        m = band == b
        if not m.any():
            continue
        rows.append((b, names[b], int(m.sum()),
                     10000 * int(m.sum()) // tot))
    return pd.DataFrame(rows, columns=["band", "trend", "n_types",
                                       "share_bps"]).astype(
        {"band": "int64", "n_types": "int64", "share_bps": "int64"})


def events_type_dow_peak(sf_dir: str) -> pd.DataFrame:
    """PER-TYPE weekday signature — each event type's peak weekday
    (ties to the earliest dow), its share, and the type's own
    uniformity chi-square via the cleared-expectation identity
    1000 * sum((7*O_d - T)^2) // (7*T) — which types are
    weekday-driven rituals and which are flat background noise. The
    per-type detail behind the global dow/hour heatmap. Per-block
    (type, dow) grid partials — constant cells, ZERO shuffle, pure
    integers."""
    ds = _read(sf_dir, "events", columns=["ts", "event_type"])

    def partial(t: pa.Table) -> pa.Table:
        d = t.column("ts").cast(pa.int64()).to_numpy() // _DAY_US
        dw = (d + 3) % 7
        et = np.asarray(t.column("event_type")).astype(object)
        df = pd.DataFrame({"et": et, "dw": dw})
        g = df.groupby(["et", "dw"], as_index=False).size()
        return pa.table({
            "et": pa.array(g["et"], type=pa.string()),
            "dw": pa.array(g["dw"].to_numpy(np.int64)),
            "n": pa.array(g["size"].to_numpy(np.int64))})

    g = (ds.map_batches(partial, batch_format="pyarrow")
         .to_pandas().groupby(["et", "dw"], as_index=False)["n"]
         .sum())
    rows = []
    for et in sorted(g["et"].unique()):
        sub = g[g["et"] == et]
        c = np.zeros(7, dtype=np.int64)
        c[sub["dw"].to_numpy(np.int64)] = sub["n"].to_numpy(np.int64)
        t = int(c.sum())
        peak = int(np.argmax(c))
        chi2 = sum(1000 * (7 * int(o) - t) ** 2 // (7 * t)
                   for o in c)
        rows.append((et, t, peak, 10000 * int(c[peak]) // t, chi2))
    return pd.DataFrame(rows, columns=[
        "event_type", "n_events", "peak_dow", "peak_share_bps",
        "chi2_milli"]).astype(
        {c: "int64" for c in ("n_events", "peak_dow",
                              "peak_share_bps", "chi2_milli")})


def orders_new_repeat_split(sf_dir: str) -> pd.DataFrame:
    """NEW-vs-REPEAT revenue split by year — the growth-accounting
    decomposition on the money: each year's revenue divides into
    customers in their FIRST year (min order year == year) vs
    returning customers, with shares in exact bps. A shrinking new
    share with flat totals = a maturing book living off its base.
    Per-block (customer, year) revenue partials fold at
    customer x years cardinality; the first-year rule is one
    driver min per customer. Pure integers."""
    ds = _read(sf_dir, "orders",
               columns=["o_custkey", "o_orderdate", "o_totalprice"])

    def partial(t: pa.Table) -> pa.Table:
        d = t.column("o_orderdate").cast(pa.int64()).to_numpy() \
            // 86_400_000_000
        yr = d.astype("datetime64[D]").astype("datetime64[Y]") \
            .astype(np.int64) + 1970
        ck = t.column("o_custkey").to_numpy().astype(np.int64)
        cents = np.floor(t.column("o_totalprice").to_numpy() * 100) \
            .astype(np.int64)
        key = ck * 10000 + yr
        u, inv = np.unique(key, return_inverse=True)
        return pa.table({
            "key": pa.array(u),
            "v": pa.array(np.bincount(inv, weights=cents,
                                      minlength=len(u))
                          .astype(np.int64))})

    g = (ds.map_batches(partial, batch_format="pyarrow")
         .to_pandas().groupby("key", as_index=False).sum())
    ck = g["key"].to_numpy(np.int64) // 10000
    yr = g["key"].to_numpy(np.int64) % 10000
    v = g["v"].to_numpy(np.int64)
    cu, cinv = np.unique(ck, return_inverse=True)
    fy = np.full(len(cu), np.iinfo(np.int64).max, np.int64)
    np.minimum.at(fy, cinv, yr)
    is_new = yr == fy[cinv]
    rows = []
    for y in np.unique(yr):
        m = yr == y
        tot = int(v[m].sum())
        new = int(v[m & is_new].sum())
        rows.append((int(y), tot, new, tot - new,
                     10000 * new // tot))
    return pd.DataFrame(rows, columns=[
        "year", "total_cents", "new_cents", "repeat_cents",
        "new_share_bps"]).astype("int64")


def orders_value_cv_by_priority(sf_dir: str) -> pd.DataFrame:
    """VALUE DISPERSION by priority class — is urgent demand also
    ERRATIC demand? Per priority: exact truncating mean (milli-
    dollars) and the squared coefficient of variation via the form
    cv2_milli = 1000*(n*Q - S^2) // S^2 — the same division-free CV
    discipline as the Syntetos-Boylan quadrants, no rational mean.
    The safety-stock multiplier table per service class. Per-block
    per-priority 3-moment partials — ZERO shuffle, pure integers
    (Python bigints / HUGEINT for n*Q)."""
    ds = _read(sf_dir, "orders",
               columns=["o_orderpriority", "o_totalprice"])

    def partial(t: pa.Table) -> pa.Table:
        pr = np.asarray(t.column("o_orderpriority")).astype(object)
        # DOLLAR units: cents squares exceed both int64 block sums
        # and float64 exactness; dollars keep n*Q inside HUGEINT
        v = np.floor(t.column("o_totalprice").to_numpy()) \
            .astype(np.int64)
        code, uniq = pd.factorize(pr)
        k = len(uniq)
        q = np.zeros(k, dtype=np.int64)
        np.add.at(q, code, v * v)
        s = np.zeros(k, dtype=np.int64)
        np.add.at(s, code, v)
        return pa.table({
            "pr": pa.array(uniq.astype(str), type=pa.string()),
            "n": pa.array(np.bincount(code, minlength=k)
                          .astype(np.int64)),
            "s": pa.array(s), "q": pa.array(q)})

    g = (ds.map_batches(partial, batch_format="pyarrow")
         .to_pandas().groupby("pr", as_index=False).sum()
         .sort_values("pr", kind="mergesort").reset_index(drop=True))
    rows = []
    for _, r in g.iterrows():
        n, s, q = int(r["n"]), int(r["s"]), int(r["q"])
        rows.append((r["pr"], n, 1000 * s // n,
                     1000 * (n * q - s * s) // (s * s)))
    return pd.DataFrame(rows, columns=[
        "priority", "n_orders", "mean_milli", "cv2_milli"]).astype(
        {c: "int64" for c in ("n_orders", "mean_milli",
                              "cv2_milli")})


def supplier_credit_hold_census(sf_dir: str) -> pd.DataFrame:
    """CREDIT-HOLD census — negative supplier account balances (the
    we-owe-them / credit-hold flag) by nation: share in exact bps
    and the over-representation lift vs the global rate fully
    cross-multiplied as 1000 * neg_n * N // (n_n * NEG) - 1000. A
    nation full of negative-balance suppliers is a payment-terms
    problem, not a sourcing one. Dimension-sized driver fold, pure
    integers."""
    supp = _read(sf_dir, "supplier",
                 columns=["s_nationkey", "s_acctbal"]).to_pandas()
    nk = supp["s_nationkey"].to_numpy(np.int64)
    neg = (np.floor(supp["s_acctbal"].to_numpy() * 100)
           .astype(np.int64) < 0).astype(np.int64)
    n_n = np.bincount(nk, minlength=25).astype(np.int64)
    g_n = np.bincount(nk, weights=neg, minlength=25).astype(np.int64)
    n_tot = int(n_n.sum())
    neg_tot = int(g_n.sum())
    rows = []
    for k in np.flatnonzero(n_n > 0):
        lift = (1000 * int(g_n[k]) * n_tot
                // (int(n_n[k]) * neg_tot) - 1000
                if neg_tot > 0 else -9999)
        rows.append((int(k), int(n_n[k]), int(g_n[k]),
                     10000 * int(g_n[k]) // int(n_n[k]), lift))
    return pd.DataFrame(rows, columns=[
        "s_nationkey", "n_suppliers", "n_negative", "neg_bps",
        "lift_milli"]).astype("int64")


def events_minute_heaping(sf_dir: str) -> pd.DataFrame:
    """MINUTE-OF-HOUR heaping — do event timestamps pile onto :00 /
    :30 (batch jobs and human scheduling masquerading as organic
    traffic)? Uniformity chi-square over the 60 minute cells via the
    cleared-expectation identity 1000*sum((60*O_m - T)^2)//(60*T),
    plus the peak minute (earliest tie) and its lift vs uniform in
    milli. The synthetic-timestamp realism / bot-detection screen.
    Per-block 60-cell partials — ZERO shuffle, pure integers."""
    ds = _read(sf_dir, "events", columns=["ts"])

    def partial(t: pa.Table) -> pa.Table:
        mn = (t.column("ts").cast(pa.int64()).to_numpy()
              // 60_000_000) % 60
        cnt = np.bincount(mn, minlength=60).astype(np.int64)
        return pa.table({"m": pa.array(np.arange(60, dtype=np.int64)),
                         "n": pa.array(cnt)})

    g = (ds.map_batches(partial, batch_format="pyarrow")
         .to_pandas().groupby("m")["n"].sum())
    c = np.zeros(60, dtype=np.int64)
    c[g.index.to_numpy()] = g.to_numpy()
    t = int(c.sum())
    chi2 = sum(1000 * (60 * int(o) - t) ** 2 // (60 * t) for o in c)
    peak = int(np.argmax(c))
    return pd.DataFrame([(t, chi2, 59, peak,
                          1000 * 60 * int(c[peak]) // t - 1000)],
                        columns=["n_events", "chi2_milli", "df",
                                 "peak_minute", "peak_lift_milli"]) \
        .astype("int64")


def brand_price_overlap(sf_dir: str) -> pd.DataFrame:
    """COMPETITIVE-SET detection — which brand pairs fight over the
    same price band? Per brand the exact ceil-rank p10/p90 retail
    band (from bounded per-brand cents histograms), then every
    unordered brand pair is classified overlap / disjoint and the
    overlap width reports in exact cents. Summary row style: total
    pairs, overlapping pairs and share in bps, plus the widest
    overlap pair under the (width desc, brands) tie rule. Grid-sized
    partials — ZERO row shuffle, pure integers."""
    ds = _read(sf_dir, "part", columns=["p_brand", "p_retailprice"])

    def partial(t: pa.Table) -> pa.Table:
        br = np.asarray(t.column("p_brand")).astype(object)
        v = np.floor(t.column("p_retailprice").to_numpy() * 100) \
            .astype(np.int64)
        df = pd.DataFrame({"br": br, "v": v})
        g = df.groupby(["br", "v"], as_index=False).size()
        return pa.table({
            "br": pa.array(g["br"], type=pa.string()),
            "v": pa.array(g["v"].to_numpy(np.int64)),
            "c": pa.array(g["size"].to_numpy(np.int64))})

    h = (ds.map_batches(partial, batch_format="pyarrow")
         .to_pandas().groupby(["br", "v"], as_index=False)["c"]
         .sum())
    bands = {}
    for br, g in h.groupby("br"):
        g = g.sort_values("v")
        v = g["v"].to_numpy(np.int64)
        c = g["c"].to_numpy(np.int64)
        cum = np.cumsum(c)
        n = int(cum[-1])
        lo = int(v[np.searchsorted(cum, (n + 9) // 10)])
        hi = int(v[np.searchsorted(cum, (9 * n + 9) // 10)])
        bands[str(br)] = (lo, hi)
    names = sorted(bands)
    n_pairs = 0
    n_over = 0
    best = None
    for i in range(len(names)):
        for j in range(i + 1, len(names)):
            n_pairs += 1
            lo = max(bands[names[i]][0], bands[names[j]][0])
            hi = min(bands[names[i]][1], bands[names[j]][1])
            if hi >= lo:
                n_over += 1
                w = hi - lo
                key = (-w, names[i], names[j])
                if best is None or key < best[0]:
                    best = (key, names[i], names[j], w)
    return pd.DataFrame([(len(names), n_pairs, n_over,
                          10000 * n_over // n_pairs,
                          best[1], best[2], best[3])],
                        columns=["n_brands", "n_pairs", "n_overlap",
                                 "overlap_bps", "widest_a",
                                 "widest_b", "widest_cents"]).astype(
        {c: "int64" for c in ("n_brands", "n_pairs", "n_overlap",
                              "overlap_bps", "widest_cents")})


def orders_priority_by_value_decile(sf_dir: str) -> pd.DataFrame:
    """DO BIG ORDERS GET URGENT TREATMENT? Urgent-class share
    (1-URGENT / 2-HIGH) per order-value decile, with deciles cut on
    the bounded $100-bin histogram by the exact 10*cum_prev//N
    starting-rank rule (the ``lineitem_tax_regressivity``
    discipline) and the urgency lift vs the global rate fully
    cross-multiplied. A flat profile = priority is assigned blind to
    value; a rising one = money talks. Per-bin (n, urgent) partials
    — ZERO shuffle, pure integers."""
    ds = _read(sf_dir, "orders",
               columns=["o_totalprice", "o_orderpriority"])

    def partial(t: pa.Table) -> pa.Table:
        v = np.floor(t.column("o_totalprice").to_numpy() * 100) \
            .astype(np.int64)
        pr = np.asarray(t.column("o_orderpriority")).astype(object)
        urg = np.array([1 if (p.startswith("1") or p.startswith("2"))
                        else 0 for p in pr], dtype=np.int64)
        b = v // 10000
        u, inv = np.unique(b, return_inverse=True)
        return pa.table({
            "b": pa.array(u),
            "n": pa.array(np.bincount(inv, minlength=len(u))
                          .astype(np.int64)),
            "urg": pa.array(np.bincount(inv, weights=urg,
                                        minlength=len(u))
                            .astype(np.int64))})

    g = (ds.map_batches(partial, batch_format="pyarrow")
         .to_pandas().groupby("b", as_index=False).sum()
         .sort_values("b"))
    n_tot = int(g["n"].sum())
    u_tot = int(g["urg"].sum())
    cum_prev = np.cumsum(g["n"].to_numpy(np.int64)) \
        - g["n"].to_numpy(np.int64)
    g["dec"] = np.minimum(10 * cum_prev // n_tot, 9)
    out = g.groupby("dec", as_index=False)[["n", "urg"]].sum()
    n = out["n"].to_numpy(np.int64)
    u = out["urg"].to_numpy(np.int64)
    out["urgent_bps"] = 10000 * u // n
    out["lift_milli"] = [1000 * int(ui) * n_tot
                         // (int(ni) * u_tot) - 1000
                         for ni, ui in zip(n, u)]
    return out.rename(columns={"dec": "decile", "n": "n_orders",
                               "urg": "n_urgent"}).astype("int64")


def events_zero_value_census(sf_dir: str) -> pd.DataFrame:
    """ZERO-VALUE census — which event types carry zero-value rows
    (instrumentation noise vs genuine free actions)? Per type: zero
    share in exact bps and the concentration lift vs the global zero
    rate fully cross-multiplied. A type where zeros spike is a
    logging regression, not user behavior. Per-block (type, is_zero)
    partials — constant cells, ZERO shuffle, pure integers."""
    ds = _read(sf_dir, "events", columns=["event_type", "value"])

    def partial(t: pa.Table) -> pa.Table:
        et = np.asarray(t.column("event_type")).astype(object)
        z = (np.floor(t.column("value").to_numpy() * 100)
             .astype(np.int64) == 0).astype(np.int64)
        df = pd.DataFrame({"et": et, "z": z})
        g = df.groupby(["et", "z"], as_index=False).size()
        return pa.table({
            "et": pa.array(g["et"], type=pa.string()),
            "z": pa.array(g["z"].to_numpy(np.int64)),
            "n": pa.array(g["size"].to_numpy(np.int64))})

    g = (ds.map_batches(partial, batch_format="pyarrow")
         .to_pandas().groupby(["et", "z"], as_index=False)["n"]
         .sum())
    tot = g.groupby("et")["n"].sum().to_dict()
    zer = {r["et"]: int(r["n"]) for _, r in
           g[g["z"] == 1].iterrows()}
    n_all = int(g["n"].sum())
    z_all = sum(zer.values())
    rows = []
    for et in sorted(tot):
        n = int(tot[et])
        z = int(zer.get(et, 0))
        lift = (1000 * z * n_all // (n * z_all) - 1000
                if z_all > 0 else -9999)
        rows.append((et, n, z, 10000 * z // n, lift))
    return pd.DataFrame(rows, columns=[
        "event_type", "n_events", "n_zero", "zero_bps",
        "lift_milli"]).astype(
        {c: "int64" for c in ("n_events", "n_zero", "zero_bps",
                              "lift_milli")})


def nation_market_depth(sf_dir: str) -> pd.DataFrame:
    """MARKET DEPTH by nation — customers per supplier, the
    demand/supply balance that decides where the next supplier
    onboarding pays: both dimension counts plus the ratio as one
    integer milli floor (nations with no suppliers report the -1
    sentinel). Dimension-only op (two tiny reads, driver join) —
    the shape every catalog-of-catalogs report takes. Pure
    integers."""
    cust = _read(sf_dir, "customer", columns=["c_nationkey"]) \
        .to_pandas()
    supp = _read(sf_dir, "supplier", columns=["s_nationkey"]) \
        .to_pandas()
    c_n = np.bincount(cust["c_nationkey"].to_numpy(np.int64),
                      minlength=25).astype(np.int64)
    s_n = np.bincount(supp["s_nationkey"].to_numpy(np.int64),
                      minlength=25).astype(np.int64)
    rows = []
    for nk in np.flatnonzero((c_n > 0) | (s_n > 0)):
        ratio = (1000 * int(c_n[nk]) // int(s_n[nk])
                 if s_n[nk] > 0 else -1)
        rows.append((int(nk), int(c_n[nk]), int(s_n[nk]), ratio))
    return pd.DataFrame(rows, columns=[
        "nationkey", "n_customers", "n_suppliers",
        "cust_per_supp_milli"]).astype("int64")


def brand_no_promo_census(sf_dir: str) -> pd.DataFrame:
    """PROMO-FREE share by brand — which brands sell at list price
    (zero discount) more than the market does? Per brand:
    zero-discount line share in exact bps and the lift vs the global
    rate fully cross-multiplied — the brand-strength / price-
    integrity signal a negotiation team reads. Part->brand LUT
    broadcast; per-block (brand, is_zero) partials — constant cells,
    ZERO row shuffle, pure integers."""
    import ray

    part = _read(sf_dir, "part",
                 columns=["p_partkey", "p_brand"]).to_pandas()
    bcode, buniq = pd.factorize(part["p_brand"], sort=True)
    pk = part["p_partkey"].to_numpy(np.int64)
    p_br = np.zeros(pk.max() + 1, dtype=np.int64)
    p_br[pk] = bcode
    nb = len(buniq)
    ref = ray.put(p_br)

    ds = _read(sf_dir, "lineitem", columns=["l_partkey", "l_discount"])

    def partial(t: pa.Table) -> pa.Table:
        p_br_ = ray.get(ref)
        br = p_br_[t.column("l_partkey").to_numpy().astype(np.int64)]
        z = (np.floor(t.column("l_discount").to_numpy() * 100)
             .astype(np.int64) == 0).astype(np.int64)
        cell = br * 2 + z
        c = np.bincount(cell, minlength=nb * 2).astype(np.int64)
        return pa.table({
            "cell": pa.array(np.arange(nb * 2, dtype=np.int64)),
            "c": pa.array(c)})

    g = (ds.map_batches(partial, batch_format="pyarrow")
         .to_pandas().groupby("cell")["c"].sum())
    grid = np.zeros(nb * 2, dtype=np.int64)
    grid[g.index.to_numpy()] = g.to_numpy()
    grid = grid.reshape(nb, 2)
    n_tot = int(grid.sum())
    z_tot = int(grid[:, 1].sum())
    rows = []
    for b in range(nb):
        n = int(grid[b].sum())
        if n == 0:
            continue
        z = int(grid[b, 1])
        lift = (1000 * z * n_tot // (n * z_tot) - 1000
                if z_tot > 0 else -9999)
        rows.append((str(buniq[b]), n, z, 10000 * z // n, lift))
    return pd.DataFrame(rows, columns=[
        "brand", "n_lines", "n_zero_disc", "zero_bps",
        "lift_milli"]).astype(
        {c: "int64" for c in ("n_lines", "n_zero_disc", "zero_bps",
                              "lift_milli")})


def entity_name_id_audit(sf_dir: str) -> pd.DataFrame:
    """NAME-KEY consistency audit — do the display names
    ('Customer#000000007', 'Supplier#000000003') actually encode the
    primary key? The referential-naming check that catches
    re-keyed-but-not-renamed migrations: per entity the parsed
    numeric suffix compares to the key, with match share in exact
    bps and the count of parse failures. Two dimension-sized reads,
    vectorized digit parsing on both sides. Pure integers."""
    rows = []
    for table, key, name in (("customer", "c_custkey", "c_name"),
                             ("supplier", "s_suppkey", "s_name")):
        df = _read(sf_dir, table, columns=[key, name]).to_pandas()
        k = df[key].to_numpy(np.int64)
        parsed = []
        bad = 0
        for s in df[name].astype(str):
            tail = s.split("#", 1)[-1]
            if tail.isdigit():
                parsed.append(int(tail))
            else:
                parsed.append(-1)
                bad += 1
        p = np.array(parsed, dtype=np.int64)
        match = int((p == k).sum())
        rows.append((table, len(df), match,
                     10000 * match // len(df), bad))
    return pd.DataFrame(rows, columns=[
        "entity", "n_rows", "n_match", "match_bps",
        "n_unparsed"]).astype(
        {c: "int64" for c in ("n_rows", "n_match", "match_bps",
                              "n_unparsed")})


def part_price_endings(sf_dir: str) -> pd.DataFrame:
    """CENTS-ENDING census — does the catalog price on charm points
    (.99), round dollars (.00), or uniformly? Distribution of
    retail-price cents endings: .00 and .99 shares in exact bps,
    the uniformity chi-square over all 100 ending cells via the
    cleared-expectation identity, and the top ending with its lift.
    The pricing-psychology audit next to the anchor-price census.
    Per-block 100-cell partials — ZERO shuffle, pure integers."""
    ds = _read(sf_dir, "part", columns=["p_retailprice"])

    def partial(t: pa.Table) -> pa.Table:
        v = np.floor(t.column("p_retailprice").to_numpy() * 100) \
            .astype(np.int64) % 100
        c = np.bincount(v, minlength=100).astype(np.int64)
        return pa.table({"e": pa.array(np.arange(100,
                                                 dtype=np.int64)),
                         "n": pa.array(c)})

    g = (ds.map_batches(partial, batch_format="pyarrow")
         .to_pandas().groupby("e")["n"].sum())
    c = np.zeros(100, dtype=np.int64)
    c[g.index.to_numpy()] = g.to_numpy()
    t = int(c.sum())
    chi2 = sum(1000 * (100 * int(o) - t) ** 2 // (100 * t)
               for o in c)
    peak = int(np.argmax(c))
    return pd.DataFrame([(t, 10000 * int(c[0]) // t,
                          10000 * int(c[99]) // t, chi2, peak,
                          1000 * 100 * int(c[peak]) // t - 1000)],
                        columns=["n_parts", "ending00_bps",
                                 "ending99_bps", "chi2_milli",
                                 "peak_ending", "peak_lift_milli"]) \
        .astype("int64")


def user_coverage_census(sf_dir: str) -> pd.DataFrame:
    """TENURE-COVERAGE census — of the days between a user's first
    and last event, how many were active? Users band by the
    cross-multiplied coverage test 100*active < k*span_days
    (single-day users separate): steady dailies vs drive-by
    returners — the engagement-shape complement to streaks and
    burstiness. One ``user % 64`` exchange of per-block distinct
    (user, day) rows; buckets fold span + distinct-day counts
    vectorized and emit one 5-cell histogram row each. Pure
    integers."""
    ds = _read(sf_dir, "events", columns=["user_id", "ts"])

    def derive(t: pa.Table) -> pa.Table:
        u = t.column("user_id").to_numpy().astype(np.int64)
        d = t.column("ts").cast(pa.int64()).to_numpy() // _DAY_US
        key = u * 32768 + (d % 32768)
        ku = np.unique(key)
        return pa.table({
            "u": pa.array(ku // 32768),
            "d": pa.array(ku % 32768),
            "bucket": pa.array(((ku // 32768) % 64).astype(np.int32))})

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        key = g["u"].to_numpy(np.int64) * 32768 \
            + g["d"].to_numpy(np.int64)
        ku = np.unique(key)
        u = ku // 32768
        d = ku % 32768
        uu, uinv = np.unique(u, return_inverse=True)
        act = np.bincount(uinv, minlength=len(uu)).astype(np.int64)
        lo = np.full(len(uu), np.iinfo(np.int64).max, np.int64)
        np.minimum.at(lo, uinv, d)
        hi = np.zeros(len(uu), np.int64)
        np.maximum.at(hi, uinv, d)
        span = hi - lo + 1
        band = np.where(span == 1, 0,
                        np.where(100 * act < 25 * span, 1,
                                 np.where(100 * act < 50 * span, 2,
                                          np.where(100 * act
                                                   < 75 * span, 3,
                                                   4))))
        h = np.bincount(band, minlength=5).astype(np.int64)
        return pd.DataFrame({"band": np.arange(5, dtype=np.int64),
                             "n_users": h})

    g = (ds.map_batches(derive, batch_format="pyarrow")
         .groupby("bucket").map_groups(fold, batch_format="pandas")
         .to_pandas().groupby("band", as_index=False).sum())
    tot = int(g["n_users"].sum())
    g = g[g["n_users"] > 0].sort_values("band").reset_index(drop=True)
    g["share_bps"] = 10000 * g["n_users"].to_numpy(np.int64) // tot
    return g.astype("int64")


def part_size_uniformity(sf_dir: str) -> pd.DataFrame:
    """SIZE-MIX uniformity — is the catalog's size assortment flat
    over the 1..50 domain or does it heap? The cleared-expectation
    chi-square 1000*sum((50*O_s - N)^2)//(50*N) over the full size
    grid (absent sizes zero-filled), the peak size with its lift,
    and the occupied-size count. The assortment-planning sanity
    check. Per-block 50-cell partials — ZERO shuffle, pure
    integers."""
    ds = _read(sf_dir, "part", columns=["p_size"])

    def partial(t: pa.Table) -> pa.Table:
        v = t.column("p_size").to_numpy().astype(np.int64)
        c = np.bincount(np.clip(v, 1, 50) - 1, minlength=50) \
            .astype(np.int64)
        return pa.table({"s": pa.array(np.arange(1, 51,
                                                 dtype=np.int64)),
                         "n": pa.array(c)})

    g = (ds.map_batches(partial, batch_format="pyarrow")
         .to_pandas().groupby("s")["n"].sum())
    c = np.zeros(50, dtype=np.int64)
    c[g.index.to_numpy() - 1] = g.to_numpy()
    t = int(c.sum())
    chi2 = sum(1000 * (50 * int(o) - t) ** 2 // (50 * t) for o in c)
    peak = int(np.argmax(c)) + 1
    return pd.DataFrame([(t, int((c > 0).sum()), chi2, 49, peak,
                          1000 * 50 * int(c[peak - 1]) // t - 1000)],
                        columns=["n_parts", "n_sizes_occupied",
                                 "chi2_milli", "df", "peak_size",
                                 "peak_lift_milli"]).astype("int64")


def lineitem_zero_zero_lift(sf_dir: str) -> pd.DataFrame:
    """ZERO-ZERO co-occurrence — are no-discount and no-tax lines
    the SAME lines (one "plain deal" code path) or independent
    flags? Joint zero-discount/zero-tax share vs the product of the
    marginals, fully cross-multiplied: lift_milli =
    1000 * n_00 * N // (n_d0 * n_t0). One 4-cell grid partial per
    block — ZERO shuffle, pure integers; the code-path-entanglement
    screen for downstream econometrics that assumes the flags are
    independent."""
    ds = _read(sf_dir, "lineitem", columns=["l_discount", "l_tax"])

    def partial(t: pa.Table) -> pa.Table:
        d0 = (np.floor(t.column("l_discount").to_numpy() * 100)
              .astype(np.int64) == 0).astype(np.int64)
        t0 = (np.floor(t.column("l_tax").to_numpy() * 100)
              .astype(np.int64) == 0).astype(np.int64)
        cell = d0 * 2 + t0
        c = np.bincount(cell, minlength=4).astype(np.int64)
        return pa.table({"cell": pa.array(np.arange(4,
                                                    dtype=np.int64)),
                         "c": pa.array(c)})

    g = (ds.map_batches(partial, batch_format="pyarrow")
         .to_pandas().groupby("cell")["c"].sum())
    c = np.zeros(4, dtype=np.int64)
    c[g.index.to_numpy()] = g.to_numpy()
    n = int(c.sum())
    n_d0 = int(c[2] + c[3])
    n_t0 = int(c[1] + c[3])
    n_00 = int(c[3])
    lift = (1000 * n_00 * n // (n_d0 * n_t0)
            if n_d0 > 0 and n_t0 > 0 else -9999)
    return pd.DataFrame([(n, n_d0, n_t0, n_00,
                          10000 * n_d0 // n, 10000 * n_t0 // n,
                          10000 * n_00 // n, lift)],
                        columns=["n_lines", "n_disc0", "n_tax0",
                                 "n_both0", "disc0_bps", "tax0_bps",
                                 "both0_bps", "lift_milli"]) \
        .astype("int64")


def customer_priority_stickiness(sf_dir: str) -> pd.DataFrame:
    """PRIORITY STICKINESS — is order priority a CUSTOMER trait or an
    order-level roll of the dice? Per customer: modal-priority order
    count m vs total orders n, banded by the cross-multiplied tests
    (single-order customers separate; then <50%, 50-74%, 75-99%,
    all-same); each band reports its customer share in exact bps and
    its modal-mass concentration 10000*sum(m)//sum(n). High all-same
    mass means priority can be a customer feature; flat means it is
    per-order noise. One ``cust % 64`` exchange of per-block
    (customer, priority-digit) pair counts; buckets fold modal/total
    masses vectorized into 5-cell partials. Pure integers."""
    ds = _read(sf_dir, "orders",
               columns=["o_custkey", "o_orderpriority"])

    def derive(t: pa.Table) -> pa.Table:
        c = t.column("o_custkey").to_numpy().astype(np.int64)
        p = pc.utf8_slice_codeunits(t.column("o_orderpriority"),
                                    0, 1).cast(pa.int64()).to_numpy()
        key = c * 8 + p
        uk, cnt = np.unique(key, return_counts=True)
        return pa.table({"c": pa.array(uk // 8),
                         "p": pa.array(uk % 8),
                         "k": pa.array(cnt.astype(np.int64)),
                         "bucket": pa.array(((uk // 8) % 64)
                                            .astype(np.int32))})

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        key = g["c"].to_numpy(np.int64) * 8 + g["p"].to_numpy(np.int64)
        uk, inv = np.unique(key, return_inverse=True)
        k = np.zeros(len(uk), np.int64)
        np.add.at(k, inv, g["k"].to_numpy(np.int64))
        cu, cinv = np.unique(uk // 8, return_inverse=True)
        n = np.zeros(len(cu), np.int64)
        np.add.at(n, cinv, k)
        m = np.zeros(len(cu), np.int64)
        np.maximum.at(m, cinv, k)
        band = np.where(n == 1, 0,
                        np.where(m == n, 4,
                                 np.where(100 * m >= 75 * n, 3,
                                          np.where(100 * m >= 50 * n,
                                                   2, 1))))
        nc = np.bincount(band, minlength=5).astype(np.int64)
        sm = np.zeros(5, np.int64)
        np.add.at(sm, band, m)
        sn = np.zeros(5, np.int64)
        np.add.at(sn, band, n)
        return pd.DataFrame({"band": np.arange(5, dtype=np.int64),
                             "n_customers": nc, "sum_m": sm,
                             "sum_n": sn})

    g = (ds.map_batches(derive, batch_format="pyarrow")
         .groupby("bucket").map_groups(fold, batch_format="pandas")
         .to_pandas().groupby("band", as_index=False).sum())
    tot = int(g["n_customers"].sum())
    g = g[g["n_customers"] > 0].sort_values("band")
    out = pd.DataFrame({
        "band": g["band"].to_numpy(np.int64),
        "n_customers": g["n_customers"].to_numpy(np.int64),
        "share_bps": 10000 * g["n_customers"].to_numpy(np.int64)
        // tot,
        "modal_bps": 10000 * g["sum_m"].to_numpy(np.int64)
        // g["sum_n"].to_numpy(np.int64)})
    return out.reset_index(drop=True).astype("int64")


def lineitem_discount_tax_independence(sf_dir: str) -> pd.DataFrame:
    """DISCOUNT × TAX independence — the full-grid sequel to
    ``lineitem_zero_zero_lift``: the whole-percent 11×9 contingency
    grid's chi-square against the independence expectation, each cell
    floored as 1000*(N*O - r*c)^2 // (N*r*c) in EXACT arbitrary-
    precision integers (HUGEINT twin; the metric is the sum of
    floored cells so both sides stay bit-equal), plus the
    occupied-cell count and the strongest-association cell with its
    lift (first-max on sorted (disc, tax) = ORDER BY lift DESC, d, t
    LIMIT 1 in the twin). One ≤176-cell partial per block — ZERO
    shuffle."""
    ds = _read(sf_dir, "lineitem", columns=["l_discount", "l_tax"])

    def partial(t: pa.Table) -> pa.Table:
        d = np.floor(t.column("l_discount").to_numpy() * 100) \
            .astype(np.int64)
        x = np.floor(t.column("l_tax").to_numpy() * 100) \
            .astype(np.int64)
        c = np.bincount(d * 16 + x, minlength=176).astype(np.int64)
        return pa.table({"cell": pa.array(np.arange(len(c),
                                                    dtype=np.int64)),
                         "n": pa.array(c)})

    g = (ds.map_batches(partial, batch_format="pyarrow")
         .to_pandas().groupby("cell")["n"].sum())
    obs = {int(cell): int(n) for cell, n in g.items() if n > 0}
    r: dict = {}
    c: dict = {}
    for cell, n in obs.items():
        r[cell // 16] = r.get(cell // 16, 0) + n
        c[cell % 16] = c.get(cell % 16, 0) + n
    big_n = sum(obs.values())
    chi2 = 0
    best = (-1, 0, 0)
    for di in sorted(r):
        for tj in sorted(c):
            o = obs.get(di * 16 + tj, 0)
            num = big_n * o - r[di] * c[tj]
            chi2 += 1000 * num * num // (big_n * r[di] * c[tj])
            lift = 1000 * big_n * o // (r[di] * c[tj])
            if lift > best[0]:
                best = (lift, di, tj)
    dof = (len(r) - 1) * (len(c) - 1)
    return pd.DataFrame([(big_n, len(r), len(c), dof, len(obs), chi2,
                          best[1], best[2], best[0] - 1000)],
                        columns=["n_lines", "n_disc_levels",
                                 "n_tax_levels", "df",
                                 "n_cells_occupied", "chi2_milli",
                                 "peak_disc", "peak_tax",
                                 "peak_lift_milli"]).astype("int64")


def nation_balance_sheet(sf_dir: str) -> pd.DataFrame:
    """BALANCE SHEET by nation — mean customer account balance vs
    mean supplier account balance side by side (truncating cents
    means, DuckDB ``//`` truncates toward zero so negatives are
    sign-decomposed) with the per-capita gap; nations missing a side
    carry the -9999999 sentinel (at small SFs most nations have zero
    suppliers). Positive gap = customers are net creditors relative
    to the supply base — a working-capital posture read from two
    dimension tables. Per-block 25-cell partials, ZERO shuffle, pure
    integers."""
    def _tdiv(a: int, b: int) -> int:
        q = abs(a) // b
        return q if a >= 0 else -q

    def make_partial(keycol: str, balcol: str):
        def partial(t: pa.Table) -> pa.Table:
            k = t.column(keycol).to_numpy().astype(np.int64)
            cents = np.floor(t.column(balcol).to_numpy() * 100) \
                .astype(np.int64)
            n = np.bincount(k, minlength=32).astype(np.int64)
            s = np.zeros(32, np.int64)
            np.add.at(s, k, cents)
            return pa.table({"k": pa.array(np.arange(32,
                                                     dtype=np.int64)),
                             "n": pa.array(n), "s": pa.array(s)})
        return partial

    folds = {}
    for table, keycol, balcol in (
            ("customer", "c_nationkey", "c_acctbal"),
            ("supplier", "s_nationkey", "s_acctbal")):
        g = (_read(sf_dir, table, columns=[keycol, balcol])
             .map_batches(make_partial(keycol, balcol),
                          batch_format="pyarrow")
             .to_pandas().groupby("k")[["n", "s"]].sum())
        folds[table] = g
    nat = _read(sf_dir, "nation",
                columns=["n_nationkey", "n_name"]).to_pandas()
    rows = []
    for k, name in sorted(zip(nat["n_nationkey"].astype(int),
                              nat["n_name"]), key=lambda x: x[1]):
        nc = int(folds["customer"]["n"].get(k, 0))
        sc = int(folds["customer"]["s"].get(k, 0))
        ns = int(folds["supplier"]["n"].get(k, 0))
        ss = int(folds["supplier"]["s"].get(k, 0))
        cm = _tdiv(sc, nc) if nc > 0 else -9999999
        sm = _tdiv(ss, ns) if ns > 0 else -9999999
        gap = cm - sm if nc > 0 and ns > 0 else -9999999
        rows.append((name, nc, ns, cm, sm, gap))
    out = pd.DataFrame(rows, columns=["nation", "n_customers",
                                      "n_suppliers",
                                      "cust_mean_cents",
                                      "supp_mean_cents",
                                      "gap_cents"])
    for c in out.columns[1:]:
        out[c] = out[c].astype("int64")
    return out


def supplier_part_repeat_census(sf_dir: str) -> pd.DataFrame:
    """SUPPLY-RELATIONSHIP depth census — how often does the SAME
    (supplier, part) pairing recur across the order book? Pairs band
    by line depth (1, 2, 3-4, 5+) with pair and line-mass shares in
    exact bps: a heavy 5+ band means stationary supply relationships
    (cacheable routing, stable pricing); an all-singleton book means
    every line re-matches from scratch. One ``pair % 256`` exchange
    of per-block distinct-pair counts; buckets fold depths
    vectorized into 4-cell partials. Pure integers."""
    ds = _read(sf_dir, "lineitem", columns=["l_suppkey", "l_partkey"])

    def derive(t: pa.Table) -> pa.Table:
        s = t.column("l_suppkey").to_numpy().astype(np.int64)
        p = t.column("l_partkey").to_numpy().astype(np.int64)
        key = s * (1 << 32) + p
        uk, cnt = np.unique(key, return_counts=True)
        return pa.table({"pair": pa.array(uk),
                         "k": pa.array(cnt.astype(np.int64)),
                         "bucket": pa.array((uk % 256)
                                            .astype(np.int32))})

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        uk, inv = np.unique(g["pair"].to_numpy(np.int64),
                            return_inverse=True)
        c = np.zeros(len(uk), np.int64)
        np.add.at(c, inv, g["k"].to_numpy(np.int64))
        band = np.where(c == 1, 0,
                        np.where(c == 2, 1, np.where(c <= 4, 2, 3)))
        np_ = np.bincount(band, minlength=4).astype(np.int64)
        nl = np.zeros(4, np.int64)
        np.add.at(nl, band, c)
        return pd.DataFrame({"band": np.arange(4, dtype=np.int64),
                             "n_pairs": np_, "n_lines": nl})

    g = (ds.map_batches(derive, batch_format="pyarrow")
         .groupby("bucket").map_groups(fold, batch_format="pandas")
         .to_pandas().groupby("band", as_index=False).sum())
    tp = int(g["n_pairs"].sum())
    tl = int(g["n_lines"].sum())
    g = g[g["n_pairs"] > 0].sort_values("band")
    out = pd.DataFrame({
        "band": g["band"].to_numpy(np.int64),
        "n_pairs": g["n_pairs"].to_numpy(np.int64),
        "pair_share_bps": 10000 * g["n_pairs"].to_numpy(np.int64)
        // tp,
        "n_lines": g["n_lines"].to_numpy(np.int64),
        "line_share_bps": 10000 * g["n_lines"].to_numpy(np.int64)
        // tl})
    return out.reset_index(drop=True).astype("int64")


def user_journey_endpoints(sf_dir: str) -> pd.DataFrame:
    """JOURNEY ENDPOINTS — the (first event type → last event type)
    matrix over users: how journeys START vs how they END, with user
    shares in exact bps. A heavy view→purchase cell is a healthy
    funnel; view→error is a product bug census. Endpoints are
    defined by the total (ts, event_id) order so duplicate
    timestamps stay deterministic. Per-block candidate extraction
    (each block contributes only its per-user first/last rows — 2
    rows per (user, block), never the event stream) into one
    ``user % 64`` exchange; buckets lexsort and emit ≤|types|² pair
    counts. Pure integers."""
    ds = _read(sf_dir, "events",
               columns=["user_id", "ts", "event_id", "event_type"])

    def derive(t: pa.Table) -> pa.Table:
        u = t.column("user_id").to_numpy().astype(np.int64)
        ts = t.column("ts").cast(pa.int64()).to_numpy()
        e = t.column("event_id").to_numpy().astype(np.int64)
        order = np.lexsort((e, ts, u))
        us = u[order]
        first = np.ones(len(us), dtype=bool)
        first[1:] = us[1:] != us[:-1]
        last = np.zeros(len(us), dtype=bool)
        last[:-1] = us[1:] != us[:-1]
        last[-1] = True
        keep = order[first | last]
        return pa.table({"u": pa.array(u[keep]),
                         "ts": pa.array(ts[keep]),
                         "e": pa.array(e[keep]),
                         "typ": t.column("event_type").take(
                             pa.array(keep)),
                         "bucket": pa.array((u[keep] % 64)
                                            .astype(np.int32))})

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        u = g["u"].to_numpy(np.int64)
        ts = g["ts"].to_numpy(np.int64)
        e = g["e"].to_numpy(np.int64)
        order = np.lexsort((e, ts, u))
        us = u[order]
        first = np.ones(len(us), dtype=bool)
        first[1:] = us[1:] != us[:-1]
        last = np.zeros(len(us), dtype=bool)
        last[:-1] = us[1:] != us[:-1]
        last[-1] = True
        typ = g["typ"].to_numpy()[order]
        pairs = pd.DataFrame({"first_type": typ[first],
                              "last_type": typ[last]})
        out = pairs.groupby(["first_type", "last_type"],
                            as_index=False).size()
        return out.rename(columns={"size": "n"})

    g = (ds.map_batches(derive, batch_format="pyarrow")
         .groupby("bucket").map_groups(fold, batch_format="pandas")
         .to_pandas()
         .groupby(["first_type", "last_type"], as_index=False)["n"]
         .sum())
    tot = int(g["n"].sum())
    g = g.sort_values(["first_type", "last_type"],
                      kind="mergesort").reset_index(drop=True)
    g["share_bps"] = 10000 * g["n"].to_numpy(np.int64) // tot
    return g.rename(columns={"n": "n_users"}).astype(
        {"n_users": "int64", "share_bps": "int64"})


def part_name_word_census(sf_dir: str) -> pd.DataFrame:
    """NAME VOCABULARY census — the word-frequency table of part
    display names (split on single spaces): occurrences, distinct
    parts containing the word, and occurrence share in exact bps. A
    tiny, heavy-headed vocabulary means names carry almost no
    entropy — search/match on names needs the key, not the label;
    the companion to ``part_name_collision_audit``. Per-block
    explode + vocabulary-sized partials (a part never spans blocks,
    so per-block distinct (part, word) pairs sum exactly) — ZERO
    shuffle."""
    ds = _read(sf_dir, "part", columns=["p_partkey", "p_name"])

    def partial(t: pa.Table) -> pa.Table:
        df = pd.DataFrame({"k": t.column("p_partkey").to_numpy(),
                           "w": t.column("p_name").to_pylist()})
        ex = df.assign(w=df["w"].str.split(" ")).explode("w")
        occ = ex.groupby("w").size()
        parts = ex.drop_duplicates().groupby("w").size()
        out = pd.DataFrame({"word": occ.index,
                            "occ": occ.to_numpy(np.int64),
                            "parts": parts.reindex(occ.index)
                            .fillna(0).to_numpy(np.int64)})
        return pa.Table.from_pandas(out, preserve_index=False)

    g = (ds.map_batches(partial, batch_format="pyarrow")
         .to_pandas().groupby("word", as_index=False)[["occ",
                                                       "parts"]]
         .sum())
    tot = int(g["occ"].sum())
    g = g.sort_values("word", kind="mergesort").reset_index(drop=True)
    out = pd.DataFrame({"word": g["word"],
                        "n_occurrences": g["occ"].astype("int64"),
                        "n_parts": g["parts"].astype("int64"),
                        "share_bps": (10000
                                      * g["occ"].to_numpy(np.int64)
                                      // tot)})
    return out.astype({"n_occurrences": "int64", "n_parts": "int64",
                       "share_bps": "int64"})


def order_linenumber_contiguity(sf_dir: str) -> pd.DataFrame:
    """LINENUMBER contiguity audit — per order, is the line-number
    sequence exactly 1..n? Orders partition into ok / duplicated
    linenumber (distinct < count) / offset start (min ≠ 1) / gapped
    tail (max ≠ count), with the ok share in exact bps. The
    lost-or-double-applied-delta detector for ingest pipelines that
    key on (order, linenumber). One ``order % 64`` exchange of
    per-block distinct (order, linenumber, rows) triples; buckets
    fold min/max/distinct/count vectorized into one 5-counter
    partial each. Pure integers."""
    ds = _read(sf_dir, "lineitem",
               columns=["l_orderkey", "l_linenumber"])

    def derive(t: pa.Table) -> pa.Table:
        o = t.column("l_orderkey").to_numpy().astype(np.int64)
        ln = t.column("l_linenumber").to_numpy().astype(np.int64)
        key = o * 64 + ln
        uk, cnt = np.unique(key, return_counts=True)
        return pa.table({"o": pa.array(uk // 64),
                         "ln": pa.array(uk % 64),
                         "k": pa.array(cnt.astype(np.int64)),
                         "bucket": pa.array(((uk // 64) % 64)
                                            .astype(np.int32))})

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        key = g["o"].to_numpy(np.int64) * 64 \
            + g["ln"].to_numpy(np.int64)
        uk, inv = np.unique(key, return_inverse=True)
        k = np.zeros(len(uk), np.int64)
        np.add.at(k, inv, g["k"].to_numpy(np.int64))
        ou, oinv = np.unique(uk // 64, return_inverse=True)
        ln = uk % 64
        n = np.zeros(len(ou), np.int64)
        np.add.at(n, oinv, k)
        dn = np.bincount(oinv, minlength=len(ou)).astype(np.int64)
        mn = np.full(len(ou), np.iinfo(np.int64).max, np.int64)
        np.minimum.at(mn, oinv, ln)
        mx = np.zeros(len(ou), np.int64)
        np.maximum.at(mx, oinv, ln)
        ok = (mn == 1) & (mx == n) & (dn == n)
        dup = dn < n
        off = (dn == n) & (mn != 1)
        gap = (dn == n) & (mn == 1) & (mx != n)
        return pd.DataFrame(
            [(len(ou), int(ok.sum()), int(dup.sum()),
              int(off.sum()), int(gap.sum()))],
            columns=["n_orders", "n_ok", "n_dup", "n_offset",
                     "n_gap"])

    g = (ds.map_batches(derive, batch_format="pyarrow")
         .groupby("bucket").map_groups(fold, batch_format="pandas")
         .to_pandas().sum())
    n_orders = int(g["n_orders"])
    return pd.DataFrame(
        [(n_orders, int(g["n_ok"]), int(g["n_dup"]),
          int(g["n_offset"]), int(g["n_gap"]),
          10000 * int(g["n_ok"]) // n_orders)],
        columns=["n_orders", "n_ok", "n_dup", "n_offset", "n_gap",
                 "ok_bps"]).astype("int64")


def supplier_activity_balance_gamma(sf_dir: str) -> pd.DataFrame:
    """ACTIVITY × BALANCE association — do busy suppliers hold
    higher account balances? Goodman-Kruskal gamma between each
    supplier's line count (capped at 1000 levels; zero-activity
    suppliers included) and its balance binned to fixed $100 bands:
    concordant/discordant pair MASSES via exact 2D suffix sums over
    the bounded (activity, band) grid — pair counts are O(N²)
    numbers computed by grid algebra, never enumerated — closing as
    sgn * 1000*|C-D| // (C+D). The twin enumerates the same binned
    pairs directly (suppliers are dimension-sized). Per-block
    supplier-count partials + one dimension read; ZERO shuffle, pure
    integers."""
    def partial(t: pa.Table) -> pa.Table:
        u, c = np.unique(t.column("l_suppkey").to_numpy()
                         .astype(np.int64), return_counts=True)
        return pa.table({"s": pa.array(u),
                         "c": pa.array(c.astype(np.int64))})

    act = (_read(sf_dir, "lineitem", columns=["l_suppkey"])
           .map_batches(partial, batch_format="pyarrow")
           .to_pandas().groupby("s")["c"].sum())
    supp = _read(sf_dir, "supplier",
                 columns=["s_suppkey", "s_acctbal"]).to_pandas()
    cnt = supp["s_suppkey"].map(act).fillna(0).to_numpy(np.int64)
    a = np.minimum(cnt, 1000)
    cents = np.floor(supp["s_acctbal"].to_numpy() * 100) \
        .astype(np.int64)
    b = (cents + 100000) // 10000
    na, nb = 1001, 110
    grid = np.zeros((na, nb), dtype=np.int64)
    np.add.at(grid, (a, b), 1)
    gt = np.zeros((na + 1, nb + 1), dtype=object)
    for i in range(na - 1, -1, -1):
        for j in range(nb - 1, -1, -1):
            gt[i][j] = (int(grid[i][j]) + gt[i + 1][j]
                        + gt[i][j + 1] - gt[i + 1][j + 1])
    conc = 0
    disc = 0
    for i, j in zip(*np.nonzero(grid)):
        nij = int(grid[i][j])
        conc += nij * int(gt[i + 1][j + 1])
        lower = gt[i + 1][0] - gt[i + 1][j] if j > 0 else 0
        disc += nij * int(lower)
    tot = conc + disc
    sgn = 1 if conc >= disc else -1
    gamma_milli = sgn * (1000 * abs(conc - disc) // tot) \
        if tot > 0 else 0
    return pd.DataFrame(
        [(len(supp), int((cnt > 0).sum()), conc, disc,
          gamma_milli)],
        columns=["n_suppliers", "n_active", "concordant_pairs",
                 "discordant_pairs", "gamma_milli"]).astype("int64")


def customer_urgency_drift(sf_dir: str) -> pd.DataFrame:
    """URGENCY DRIFT — within a customer's order history, does
    priority escalate or relax over time? Every strictly-dated
    within-customer order pair votes: priority digit rises
    (concordant), falls (discordant), or ties; gamma closes as
    sgn * 1000*|C-D| // (C+D). Same-day pairs are excluded by the
    strict date order on BOTH sides. One ``cust % 64`` exchange of
    per-block (customer, day, priority, multiplicity) rollups;
    buckets self-merge per customer (pair mass via multiplicity
    products, order streams per customer are short) and emit one
    4-counter partial. Pure integers."""
    ds = _read(sf_dir, "orders",
               columns=["o_custkey", "o_orderdate",
                        "o_orderpriority"])

    def derive(t: pa.Table) -> pa.Table:
        c = t.column("o_custkey").to_numpy().astype(np.int64)
        d = t.column("o_orderdate").cast(pa.int64()).to_numpy() \
            // _DAY_US
        p = pc.utf8_slice_codeunits(t.column("o_orderpriority"),
                                    0, 1).cast(pa.int64()).to_numpy()
        key = c * (1 << 18) + (d % (1 << 15)) * 8 + p
        uk, cnt = np.unique(key, return_counts=True)
        return pa.table({"c": pa.array(uk >> 18),
                         "d": pa.array((uk >> 3) & ((1 << 15) - 1)),
                         "p": pa.array(uk & 7),
                         "k": pa.array(cnt.astype(np.int64)),
                         "bucket": pa.array(((uk >> 18) % 64)
                                            .astype(np.int32))})

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        g = (g.groupby(["c", "d", "p"], as_index=False)["k"].sum())
        m = g.merge(g, on="c")
        dated = m[m["d_x"] < m["d_y"]]
        w = dated["k_x"].to_numpy(np.int64) \
            * dated["k_y"].to_numpy(np.int64)
        up = dated["p_y"].to_numpy(np.int64) \
            > dated["p_x"].to_numpy(np.int64)
        dn = dated["p_y"].to_numpy(np.int64) \
            < dated["p_x"].to_numpy(np.int64)
        tot = g.groupby("c")["k"].sum()
        return pd.DataFrame(
            [(int((tot >= 2).sum()), int(w.sum()),
              int(w[up].sum()), int(w[dn].sum()))],
            columns=["n_multi", "n_pairs", "conc", "disc"])

    g = (ds.map_batches(derive, batch_format="pyarrow")
         .groupby("bucket").map_groups(fold, batch_format="pandas")
         .to_pandas().sum())
    conc, disc = int(g["conc"]), int(g["disc"])
    tot = conc + disc
    sgn = 1 if conc >= disc else -1
    gamma_milli = sgn * (1000 * abs(conc - disc) // tot) \
        if tot > 0 else 0
    return pd.DataFrame(
        [(int(g["n_multi"]), int(g["n_pairs"]), conc, disc,
          gamma_milli)],
        columns=["n_customers_multi", "n_dated_pairs",
                 "concordant_pairs", "discordant_pairs",
                 "gamma_milli"]).astype("int64")


def part_size_price_gamma(sf_dir: str) -> pd.DataFrame:
    """SIZE × PRICE monotonicity — do bigger parts list higher?
    Goodman-Kruskal gamma between p_size (1..50) and the retail
    price binned to whole dollars (cents // 100 — the catalog here
    spans a narrow band, so dollar bins keep the ordinal signal):
    concordant/discordant pair masses via exact 2D suffix sums over
    the (size, dollar) grid; the twin pairs the GRID CELLS weighted
    by count products, never the parts. Per-block cell partials —
    ZERO shuffle, pure integers."""
    ds = _read(sf_dir, "part", columns=["p_size", "p_retailprice"])

    def partial(t: pa.Table) -> pa.Table:
        a = t.column("p_size").to_numpy().astype(np.int64)
        b = np.floor(t.column("p_retailprice").to_numpy() * 100) \
            .astype(np.int64) // 100
        key = a * (1 << 32) + b
        uk, cnt = np.unique(key, return_counts=True)
        return pa.table({"a": pa.array(uk >> 32),
                         "b": pa.array(uk & ((1 << 32) - 1)),
                         "n": pa.array(cnt.astype(np.int64))})

    g = (ds.map_batches(partial, batch_format="pyarrow")
         .to_pandas().groupby(["a", "b"], as_index=False)["n"].sum())
    a = g["a"].to_numpy(np.int64)
    b = g["b"].to_numpy(np.int64)
    cnt = g["n"].to_numpy(np.int64)
    amin, bmin = int(a.min()), int(b.min())
    na = int(a.max()) - amin + 1
    nb = int(b.max()) - bmin + 1
    grid = np.zeros((na, nb), dtype=np.int64)
    grid[a - amin, b - bmin] = cnt
    gt = np.zeros((na + 1, nb + 1), dtype=object)
    for i in range(na - 1, -1, -1):
        for j in range(nb - 1, -1, -1):
            gt[i][j] = (int(grid[i][j]) + gt[i + 1][j]
                        + gt[i][j + 1] - gt[i + 1][j + 1])
    conc = 0
    disc = 0
    for i, j in zip(*np.nonzero(grid)):
        nij = int(grid[i][j])
        conc += nij * int(gt[i + 1][j + 1])
        lower = gt[i + 1][0] - gt[i + 1][j] if j > 0 else 0
        disc += nij * int(lower)
    tot = conc + disc
    sgn = 1 if conc >= disc else -1
    gamma_milli = sgn * (1000 * abs(conc - disc) // tot) \
        if tot > 0 else 0
    return pd.DataFrame(
        [(int(cnt.sum()), na, nb, conc, disc, gamma_milli)],
        columns=["n_parts", "n_sizes_span", "n_dollar_span",
                 "concordant_pairs", "discordant_pairs",
                 "gamma_milli"]).astype("int64")


def segment_priority_mix(sf_dir: str) -> pd.DataFrame:
    """SEGMENT × PRIORITY mix — does market segment predict how
    urgently its customers order? Per (segment, priority digit)
    cell: order count, the within-segment share in exact bps, and
    the lift vs the global priority mix fully cross-multiplied as
    1000*o*N // (r*c) - 1000. Customer->segment LUT broadcast
    (customers are dimension-sized); per-block constant-cell
    partials — ZERO row shuffle, pure integers."""
    import ray

    cust = _read(sf_dir, "customer",
                 columns=["c_custkey", "c_mktsegment"]).to_pandas()
    scode, suniq = pd.factorize(cust["c_mktsegment"], sort=True)
    ck = cust["c_custkey"].to_numpy(np.int64)
    lut = np.zeros(ck.max() + 1, dtype=np.int64)
    lut[ck] = scode
    ns = len(suniq)
    ref = ray.put(lut)

    ds = _read(sf_dir, "orders",
               columns=["o_custkey", "o_orderpriority"])

    def partial(t: pa.Table) -> pa.Table:
        lut_ = ray.get(ref)
        seg = lut_[t.column("o_custkey").to_numpy().astype(np.int64)]
        p = pc.utf8_slice_codeunits(t.column("o_orderpriority"),
                                    0, 1).cast(pa.int64()).to_numpy()
        cell = seg * 8 + p
        c = np.bincount(cell, minlength=ns * 8).astype(np.int64)
        return pa.table({
            "cell": pa.array(np.arange(ns * 8, dtype=np.int64)),
            "c": pa.array(c)})

    g = (ds.map_batches(partial, batch_format="pyarrow")
         .to_pandas().groupby("cell")["c"].sum())
    grid = np.zeros(ns * 8, dtype=np.int64)
    grid[g.index.to_numpy()] = g.to_numpy()
    grid = grid.reshape(ns, 8)
    n_tot = int(grid.sum())
    col = grid.sum(axis=0)
    rows = []
    for s in range(ns):
        rn = int(grid[s].sum())
        for p in range(8):
            o = int(grid[s, p])
            if o == 0:
                continue
            rows.append((str(suniq[s]), p, o, 10000 * o // rn,
                         1000 * o * n_tot // (rn * int(col[p]))
                         - 1000))
    out = pd.DataFrame(rows, columns=["segment", "priority",
                                      "n_orders", "seg_share_bps",
                                      "lift_milli"])
    for c2 in out.columns[1:]:
        out[c2] = out[c2].astype("int64")
    return out


def lineitem_net_multiplier_census(sf_dir: str) -> pd.DataFrame:
    """NET-MULTIPLIER census — the exact distribution of the
    combined discount-and-tax factor (100-d%)*(100+t%) per line
    (an integer in basis-point² units; distinct (d, t) combos that
    land on the same product POOL, identically on both sides), with
    line shares, gross cents, and the group's exact net cents
    (sum * m // 10000 — m is constant within a group so one floor
    suffices). The what-does-a-dollar-of-list-actually-bill
    profile. Per-block ≤176-cell partials — ZERO shuffle, pure
    integers."""
    ds = _read(sf_dir, "lineitem",
               columns=["l_discount", "l_tax", "l_extendedprice"])

    def partial(t: pa.Table) -> pa.Table:
        d = np.floor(t.column("l_discount").to_numpy() * 100) \
            .astype(np.int64)
        x = np.floor(t.column("l_tax").to_numpy() * 100) \
            .astype(np.int64)
        cents = np.floor(t.column("l_extendedprice").to_numpy()
                         * 100).astype(np.int64)
        cell = d * 16 + x
        n = np.bincount(cell, minlength=176).astype(np.int64)
        s = np.zeros(len(n), np.int64)
        np.add.at(s, cell, cents)
        return pa.table({"cell": pa.array(np.arange(len(n),
                                                    dtype=np.int64)),
                         "n": pa.array(n), "s": pa.array(s)})

    g = (ds.map_batches(partial, batch_format="pyarrow")
         .to_pandas().groupby("cell")[["n", "s"]].sum())
    pooled: dict = {}
    for cell, row in g.iterrows():
        if int(row["n"]) == 0:
            continue
        m = (100 - cell // 16) * (100 + cell % 16)
        n0, s0 = pooled.get(m, (0, 0))
        pooled[m] = (n0 + int(row["n"]), s0 + int(row["s"]))
    tot = sum(n for n, _ in pooled.values())
    rows = [(m, n, 10000 * n // tot, s, s * m // 10000)
            for m, (n, s) in sorted(pooled.items())]
    return pd.DataFrame(rows, columns=["multiplier", "n_lines",
                                       "line_share_bps",
                                       "gross_cents",
                                       "net_cents"]).astype("int64")


def embedding_dim_sign_balance(sf_dir: str) -> pd.DataFrame:
    """DIMENSION sign balance — per embedding dimension, the share
    of strictly-positive components in exact bps plus exact-zero
    counts: a dimension pinned (near-)all-positive or all-negative
    after normalization carries a bias term, not a feature, and a
    heavy zero count is a dead dimension (the pre-quantization
    screen). Per-block 64-cell partials over the stacked matrix —
    ZERO shuffle, pure integers; sign tests are exact under the
    float32 -> float64 cast on both sides."""
    ds = _read(sf_dir, "embeddings", columns=["embedding"],
               rows_per_block=4096)

    def partial(t: pa.Table) -> pa.Table:
        m = np.stack(t.column("embedding").to_numpy(
            zero_copy_only=False)).astype(np.float64)
        pos = (m > 0).sum(axis=0).astype(np.int64)
        zer = (m == 0).sum(axis=0).astype(np.int64)
        return pa.table({"dim": pa.array(np.arange(1, m.shape[1] + 1,
                                                   dtype=np.int64)),
                         "n": pa.array(np.full(m.shape[1], m.shape[0],
                                               dtype=np.int64)),
                         "n_pos": pa.array(pos),
                         "n_zero": pa.array(zer)})

    g = (ds.map_batches(partial, batch_format="pyarrow")
         .to_pandas().groupby("dim", as_index=False)[["n", "n_pos",
                                                      "n_zero"]]
         .sum().sort_values("dim").reset_index(drop=True))
    g["pos_bps"] = 10000 * g["n_pos"].to_numpy(np.int64) \
        // g["n"].to_numpy(np.int64)
    return g.astype("int64")


def nation_supplier_activity_hhi(sf_dir: str) -> pd.DataFrame:
    """ACTIVITY concentration by nation — the Herfindahl index of
    LINE-VOLUME shares across each nation's suppliers (the
    who-actually-ships complement to the balance-based
    ``supplier_hhi``): HHI·1e8 = Σc² ·1e8 // (Σc)² in exact
    arbitrary-precision integers, with supplier/active counts and
    the top supplier's volume share in bps; zero-volume nations
    carry the -1 sentinel. A nation whose shipping runs through one
    supplier is a single point of failure regardless of how many
    are registered. Per-block supplier-count partials + two
    dimension reads — ZERO shuffle."""
    def partial(t: pa.Table) -> pa.Table:
        u, c = np.unique(t.column("l_suppkey").to_numpy()
                         .astype(np.int64), return_counts=True)
        return pa.table({"s": pa.array(u),
                         "c": pa.array(c.astype(np.int64))})

    act = (_read(sf_dir, "lineitem", columns=["l_suppkey"])
           .map_batches(partial, batch_format="pyarrow")
           .to_pandas().groupby("s")["c"].sum())
    supp = _read(sf_dir, "supplier",
                 columns=["s_suppkey", "s_nationkey"]).to_pandas()
    nat = _read(sf_dir, "nation",
                columns=["n_nationkey", "n_name"]).to_pandas()
    names = dict(zip(nat["n_nationkey"].astype(int), nat["n_name"]))
    cnt = supp["s_suppkey"].map(act).fillna(0).to_numpy(np.int64)
    nk = supp["s_nationkey"].to_numpy(np.int64)
    rows = []
    for k in sorted(set(nk.tolist()), key=lambda k: names[k]):
        c = cnt[nk == k]
        tot = int(c.sum())
        ss = sum(int(x) * int(x) for x in c)
        hhi = ss * 100000000 // (tot * tot) if tot > 0 else -1
        top = 10000 * int(c.max()) // tot if tot > 0 else -1
        rows.append((names[k], len(c), int((c > 0).sum()), tot, hhi,
                     top))
    out = pd.DataFrame(rows, columns=["nation", "n_suppliers",
                                      "n_active", "n_lines",
                                      "hhi_e8", "top_share_bps"])
    for c2 in out.columns[1:]:
        out[c2] = out[c2].astype("int64")
    return out


def order_ship_span_census(sf_dir: str) -> pd.DataFrame:
    """FULFILLMENT fragmentation — within an order, how many days
    separate the first and the last line shipment? Orders band by
    span (same-day, within a week, within a month, within a
    quarter, longer) with shares in exact bps and the exact overall
    milli mean span (truncating): a fat long tail means orders
    routinely straggle across shipments and downstream consolidated-
    invoice logic must handle partial fills. One ``order % 64``
    exchange of per-block (order, min_day, max_day) partials;
    buckets fold spans vectorized into 5-cell histogram + sum
    partials. Pure integers."""
    ds = _read(sf_dir, "lineitem",
               columns=["l_orderkey", "l_shipdate"])

    def derive(t: pa.Table) -> pa.Table:
        o = t.column("l_orderkey").to_numpy().astype(np.int64)
        d = t.column("l_shipdate").cast(pa.int64()).to_numpy() \
            // _DAY_US
        ou, oinv = np.unique(o, return_inverse=True)
        mn = np.full(len(ou), np.iinfo(np.int64).max, np.int64)
        np.minimum.at(mn, oinv, d)
        mx = np.zeros(len(ou), np.int64)
        np.maximum.at(mx, oinv, d)
        return pa.table({"o": pa.array(ou), "mn": pa.array(mn),
                         "mx": pa.array(mx),
                         "bucket": pa.array((ou % 64)
                                            .astype(np.int32))})

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        ou, oinv = np.unique(g["o"].to_numpy(np.int64),
                             return_inverse=True)
        mn = np.full(len(ou), np.iinfo(np.int64).max, np.int64)
        np.minimum.at(mn, oinv, g["mn"].to_numpy(np.int64))
        mx = np.zeros(len(ou), np.int64)
        np.maximum.at(mx, oinv, g["mx"].to_numpy(np.int64))
        span = mx - mn
        band = np.where(span == 0, 0,
                        np.where(span <= 7, 1,
                                 np.where(span <= 30, 2,
                                          np.where(span <= 90, 3,
                                                   4))))
        h = np.bincount(band, minlength=5).astype(np.int64)
        ss = np.zeros(5, np.int64)
        ss[0] = int(span.sum())
        return pd.DataFrame({"band": np.arange(5, dtype=np.int64),
                             "n_orders": h, "sum_span": ss})

    g = (ds.map_batches(derive, batch_format="pyarrow")
         .groupby("bucket").map_groups(fold, batch_format="pandas")
         .to_pandas().groupby("band", as_index=False).sum())
    tot = int(g["n_orders"].sum())
    sum_span = int(g["sum_span"].sum())
    g = g[g["n_orders"] > 0].sort_values("band")
    out = pd.DataFrame({
        "band": g["band"].to_numpy(np.int64),
        "n_orders": g["n_orders"].to_numpy(np.int64),
        "share_bps": 10000 * g["n_orders"].to_numpy(np.int64)
        // tot})
    out["mean_span_milli"] = 1000 * sum_span // tot
    return out.reset_index(drop=True).astype("int64")


def embedding_label_doc_mix(sf_dir: str) -> pd.DataFrame:
    """LABEL × LANGUAGE mix across the modality boundary — are the
    embedding labels just language clusters in disguise? Joins
    embeddings to documents on vec_id = doc_id (the corpus the
    vectors were computed from) and reports, per (label, lang)
    cell: vector count, the within-label share in exact bps, and
    the lift vs the global language mix cross-multiplied as
    1000*o*N // (r*c) - 1000. Scale shape is the tagged-union
    ``id % 64`` hash join (both sides are fact-sized at 100 TB —
    each ships one slim (id, tag, payload) row, buckets merge and
    emit cell counts); no broadcast of either table. Pure
    integers."""
    emb = (_read(sf_dir, "embeddings", columns=["vec_id", "label"])
           .map_batches(lambda t: pa.table({
               "k": t.column("vec_id").cast(pa.int64()),
               "label": t.column("label").cast(pa.int64()),
               "lang": pa.array([""] * len(t), type=pa.string()),
               "bucket": pc.cast(pc.bit_wise_and(
                   t.column("vec_id").cast(pa.int64()), 63),
                   pa.int32())}), batch_format="pyarrow"))
    doc = (_read(sf_dir, "documents", columns=["doc_id", "lang"])
           .map_batches(lambda t: pa.table({
               "k": t.column("doc_id").cast(pa.int64()),
               "label": pa.array([-1] * len(t), type=pa.int64()),
               "lang": t.column("lang"),
               "bucket": pc.cast(pc.bit_wise_and(
                   t.column("doc_id").cast(pa.int64()), 63),
                   pa.int32())}), batch_format="pyarrow"))

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        left = g[g["label"] >= 0][["k", "label"]]
        right = g[g["label"] < 0][["k", "lang"]]
        m = left.merge(right, on="k")
        out = m.groupby(["label", "lang"], as_index=False).size()
        return out.rename(columns={"size": "n"})

    g = (emb.union(doc).groupby("bucket")
         .map_groups(fold, batch_format="pandas")
         .to_pandas()
         .groupby(["label", "lang"], as_index=False)["n"].sum())
    n_tot = int(g["n"].sum())
    rn = g.groupby("label")["n"].sum()
    cn = g.groupby("lang")["n"].sum()
    g = g.sort_values(["label", "lang"],
                      kind="mergesort").reset_index(drop=True)
    lab = g["label"].to_numpy(np.int64)
    n = g["n"].to_numpy(np.int64)
    r = rn.loc[g["label"]].to_numpy(np.int64)
    c = cn.loc[g["lang"]].to_numpy(np.int64)
    out = pd.DataFrame({"label": lab, "lang": g["lang"],
                        "n_vecs": n,
                        "label_share_bps": 10000 * n // r,
                        "lift_milli": 1000 * n * n_tot // (r * c)
                        - 1000})
    return out.astype({"label": "int64", "n_vecs": "int64",
                       "label_share_bps": "int64",
                       "lift_milli": "int64"})


def embedding_coverage_by_source(sf_dir: str) -> pd.DataFrame:
    """EMBEDDING coverage — which corpus slices still lack vectors?
    Per document source: total docs, docs with an embedding row
    (vec_id = doc_id), and coverage in exact bps — the
    is-the-index-complete gate before any semantic-dedup or ANN
    stage is trusted. Scale shape is the tagged-union ``id % 64``
    hash ANTI-join probe (documents ship (id, source), embeddings
    ship bare ids; buckets membership-test vectorized) — no
    broadcast of either side. Pure integers."""
    emb = (_read(sf_dir, "embeddings", columns=["vec_id"])
           .map_batches(lambda t: pa.table({
               "k": t.column("vec_id").cast(pa.int64()),
               "source": pa.array([""] * len(t), type=pa.string()),
               "tag": pa.array(np.zeros(len(t), np.int64)),
               "bucket": pc.cast(pc.bit_wise_and(
                   t.column("vec_id").cast(pa.int64()), 63),
                   pa.int32())}), batch_format="pyarrow"))
    doc = (_read(sf_dir, "documents", columns=["doc_id", "source"])
           .map_batches(lambda t: pa.table({
               "k": t.column("doc_id").cast(pa.int64()),
               "source": t.column("source"),
               "tag": pa.array(np.ones(len(t), np.int64)),
               "bucket": pc.cast(pc.bit_wise_and(
                   t.column("doc_id").cast(pa.int64()), 63),
                   pa.int32())}), batch_format="pyarrow"))

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        have = set(g.loc[g["tag"] == 0, "k"].tolist())
        d = g[g["tag"] == 1]
        hit = d["k"].isin(have)
        out = pd.DataFrame({"source": d["source"],
                            "hit": hit.astype(np.int64)})
        r = out.groupby("source", as_index=False).agg(
            n_docs=("hit", "size"), n_with_vec=("hit", "sum"))
        return r

    g = (emb.union(doc).groupby("bucket")
         .map_groups(fold, batch_format="pandas")
         .to_pandas()
         .groupby("source", as_index=False)[["n_docs",
                                             "n_with_vec"]].sum()
         .sort_values("source").reset_index(drop=True))
    g["coverage_bps"] = 10000 * g["n_with_vec"].to_numpy(np.int64) \
        // g["n_docs"].to_numpy(np.int64)
    return g.astype({"n_docs": "int64", "n_with_vec": "int64",
                     "coverage_bps": "int64"})


def part_competition_price_spread(sf_dir: str) -> pd.DataFrame:
    """COMPETITION vs PRICE SPREAD — does having more suppliers for
    a part tighten its observed unit-price range? Per part: distinct
    supplier count (capped at 10) and the relative unit-price spread
    10000*(max-min)//min basis points (truncating ``cents // qty``
    units, capped at 10000); then per competition level: part count,
    exact milli mean spread and the exact ceil-rank p50 spread. A
    falling curve is the textbook competition story; a flat one
    means pricing ignores the supply base. One ``part % 64``
    exchange of per-block (part, supplier, min/max unit) rollups;
    buckets fold parts vectorized and emit bounded (level, spread)
    cell counts. Pure integers."""
    ds = _read(sf_dir, "lineitem",
               columns=["l_partkey", "l_suppkey", "l_extendedprice",
                        "l_quantity"])

    def derive(t: pa.Table) -> pa.Table:
        p = t.column("l_partkey").to_numpy().astype(np.int64)
        s = t.column("l_suppkey").to_numpy().astype(np.int64)
        uc = (np.floor(t.column("l_extendedprice").to_numpy() * 100)
              .astype(np.int64)
              // np.floor(t.column("l_quantity").to_numpy())
              .astype(np.int64))
        key = p * (1 << 32) + s
        uk, inv = np.unique(key, return_inverse=True)
        mn = np.full(len(uk), np.iinfo(np.int64).max, np.int64)
        np.minimum.at(mn, inv, uc)
        mx = np.zeros(len(uk), np.int64)
        np.maximum.at(mx, inv, uc)
        return pa.table({"p": pa.array(uk >> 32),
                         "s": pa.array(uk & ((1 << 32) - 1)),
                         "mn": pa.array(mn), "mx": pa.array(mx),
                         "bucket": pa.array(((uk >> 32) % 64)
                                            .astype(np.int32))})

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        key = g["p"].to_numpy(np.int64) * (1 << 32) \
            + g["s"].to_numpy(np.int64)
        uk, inv = np.unique(key, return_inverse=True)
        mn = np.full(len(uk), np.iinfo(np.int64).max, np.int64)
        np.minimum.at(mn, inv, g["mn"].to_numpy(np.int64))
        mx = np.zeros(len(uk), np.int64)
        np.maximum.at(mx, inv, g["mx"].to_numpy(np.int64))
        pu, pinv = np.unique(uk >> 32, return_inverse=True)
        ns = np.bincount(pinv, minlength=len(pu)).astype(np.int64)
        pmn = np.full(len(pu), np.iinfo(np.int64).max, np.int64)
        np.minimum.at(pmn, pinv, mn)
        pmx = np.zeros(len(pu), np.int64)
        np.maximum.at(pmx, pinv, mx)
        level = np.minimum(ns, 10)
        sp = np.minimum(10000 * (pmx - pmn)
                        // np.maximum(pmn, 1), 10000)
        cell = level * 16384 + sp
        uc2, c2 = np.unique(cell, return_counts=True)
        return pd.DataFrame({"level": uc2 // 16384,
                             "sp": uc2 % 16384,
                             "c": c2.astype(np.int64)})

    g = (ds.map_batches(derive, batch_format="pyarrow")
         .groupby("bucket").map_groups(fold, batch_format="pandas")
         .to_pandas()
         .groupby(["level", "sp"], as_index=False)["c"].sum())
    rows = []
    for level in sorted(g["level"].unique()):
        sub = g[g["level"] == level].sort_values("sp")
        n = int(sub["c"].sum())
        ssum = int((sub["sp"].to_numpy(np.int64)
                    * sub["c"].to_numpy(np.int64)).sum())
        cum = sub["c"].cumsum().to_numpy(np.int64)
        rank = (50 * n + 99) // 100
        p50 = int(sub["sp"].to_numpy(np.int64)[
            np.searchsorted(cum, rank)])
        rows.append((int(level), n, 1000 * ssum // n, p50))
    return pd.DataFrame(rows, columns=["n_suppliers_capped",
                                       "n_parts",
                                       "mean_spread_bp_milli",
                                       "p50_spread_bp"]) \
        .astype("int64")


def lineitem_price_divisibility_audit(sf_dir: str) -> pd.DataFrame:
    """PRICE DIVISIBILITY audit — is extended price an exact
    per-unit multiple (cents % qty == 0) at every quantity level?
    Per quantity 1..50: line count, divisible count and the share
    in exact bps. A sub-10000 share at some quantity means unit
    prices there carry sub-cent precision (a rounding landmine for
    any revenue-per-unit readout downstream — ``cents // qty``
    truncation silently loses mass). Per-block 100-cell partials —
    ZERO shuffle, pure integers."""
    ds = _read(sf_dir, "lineitem",
               columns=["l_quantity", "l_extendedprice"])

    def partial(t: pa.Table) -> pa.Table:
        q = np.floor(t.column("l_quantity").to_numpy()) \
            .astype(np.int64)
        cents = np.floor(t.column("l_extendedprice").to_numpy()
                         * 100).astype(np.int64)
        div = (cents % q == 0).astype(np.int64)
        cell = np.clip(q, 1, 50) * 2 + div
        c = np.bincount(cell, minlength=102).astype(np.int64)
        return pa.table({"cell": pa.array(np.arange(len(c),
                                                    dtype=np.int64)),
                         "c": pa.array(c)})

    g = (ds.map_batches(partial, batch_format="pyarrow")
         .to_pandas().groupby("cell")["c"].sum())
    cnt = np.zeros(102, dtype=np.int64)
    cnt[g.index.to_numpy()] = g.to_numpy()
    rows = []
    for q in range(1, 51):
        n = int(cnt[q * 2] + cnt[q * 2 + 1])
        if n == 0:
            continue
        d = int(cnt[q * 2 + 1])
        rows.append((q, n, d, 10000 * d // n))
    return pd.DataFrame(rows, columns=["quantity", "n_lines",
                                       "n_divisible", "div_bps"]) \
        .astype("int64")


def customer_same_day_orders(sf_dir: str) -> pd.DataFrame:
    """SAME-DAY multi-order census — how many customers ever place
    two or more orders on one calendar day, how much order mass
    those days carry, and the single busiest (customer, day)? The
    dedup-vs-genuine-burst screen for order ingestion (a spike here
    is either bot traffic or a retry bug) and the tie-breaker
    stress-test for sequence features keyed on (customer, day). One
    ``cust % 64`` exchange of per-block (customer, day) pair
    counts; buckets fold multiplicities vectorized into one
    5-counter partial each. Pure integers."""
    ds = _read(sf_dir, "orders",
               columns=["o_custkey", "o_orderdate"])

    def derive(t: pa.Table) -> pa.Table:
        c = t.column("o_custkey").to_numpy().astype(np.int64)
        d = t.column("o_orderdate").cast(pa.int64()).to_numpy() \
            // _DAY_US
        key = c * 32768 + (d % 32768)
        uk, cnt = np.unique(key, return_counts=True)
        return pa.table({"c": pa.array(uk // 32768),
                         "d": pa.array(uk % 32768),
                         "k": pa.array(cnt.astype(np.int64)),
                         "bucket": pa.array(((uk // 32768) % 64)
                                            .astype(np.int32))})

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        key = g["c"].to_numpy(np.int64) * 32768 \
            + g["d"].to_numpy(np.int64)
        uk, inv = np.unique(key, return_inverse=True)
        k = np.zeros(len(uk), np.int64)
        np.add.at(k, inv, g["k"].to_numpy(np.int64))
        cu, cinv = np.unique(uk // 32768, return_inverse=True)
        mx = np.zeros(len(cu), np.int64)
        np.maximum.at(mx, cinv, k)
        multi_days = k >= 2
        return pd.DataFrame(
            [(len(cu), int((mx >= 2).sum()), int(multi_days.sum()),
              int(k[multi_days].sum()), int(k.max()))],
            columns=["n_customers", "n_cust_same_day",
                     "n_multi_days", "n_orders_on_multi_days",
                     "max_one_day"])

    g = (ds.map_batches(derive, batch_format="pyarrow")
         .groupby("bucket").map_groups(fold, batch_format="pandas")
         .to_pandas())
    n_cust = int(g["n_customers"].sum())
    n_same = int(g["n_cust_same_day"].sum())
    return pd.DataFrame(
        [(n_cust, n_same, 10000 * n_same // n_cust,
          int(g["n_multi_days"].sum()),
          int(g["n_orders_on_multi_days"].sum()),
          int(g["max_one_day"].max()))],
        columns=["n_customers", "n_cust_same_day",
                 "same_day_bps", "n_multi_days",
                 "n_orders_on_multi_days", "max_one_day"]) \
        .astype("int64")


def user_weekend_value_census(sf_dir: str) -> pd.DataFrame:
    """WEEKEND-VALUE census — of each user's total event value, how
    much lands on Saturday/Sunday? Users band by the
    cross-multiplied share test (no-value users separate, then
    zero-weekend, <25%, <50%, <75%, >=75%) with shares in exact
    bps: the leisure-vs-worktime revenue shape that decides when to
    ship releases and run promos. One ``user % 64`` exchange of
    per-block (user, total, weekend) cent sums; buckets fold and
    emit one 6-cell histogram each. Weekday index matches the
    twin's (epoch_day + 4) % 7 with weekend = {0, 6}. Pure
    integers."""
    ds = _read(sf_dir, "events", columns=["user_id", "ts", "value"])

    def derive(t: pa.Table) -> pa.Table:
        u = t.column("user_id").to_numpy().astype(np.int64)
        day = t.column("ts").cast(pa.int64()).to_numpy() // _DAY_US
        wk = ((day + 4) % 7)
        is_we = ((wk == 0) | (wk == 6)).astype(np.int64)
        cents = np.floor(t.column("value").to_numpy() * 100) \
            .astype(np.int64)
        uu, inv = np.unique(u, return_inverse=True)
        tv = np.zeros(len(uu), np.int64)
        np.add.at(tv, inv, cents)
        wv = np.zeros(len(uu), np.int64)
        np.add.at(wv, inv, cents * is_we)
        return pa.table({"u": pa.array(uu), "tv": pa.array(tv),
                         "wv": pa.array(wv),
                         "bucket": pa.array((uu % 64)
                                            .astype(np.int32))})

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        uu, inv = np.unique(g["u"].to_numpy(np.int64),
                            return_inverse=True)
        tv = np.zeros(len(uu), np.int64)
        np.add.at(tv, inv, g["tv"].to_numpy(np.int64))
        wv = np.zeros(len(uu), np.int64)
        np.add.at(wv, inv, g["wv"].to_numpy(np.int64))
        band = np.where(tv == 0, 0,
                        np.where(wv == 0, 1,
                                 np.where(100 * wv < 25 * tv, 2,
                                          np.where(100 * wv < 50
                                                   * tv, 3,
                                                   np.where(100 * wv
                                                            < 75
                                                            * tv, 4,
                                                            5)))))
        h = np.bincount(band, minlength=6).astype(np.int64)
        return pd.DataFrame({"band": np.arange(6, dtype=np.int64),
                             "n_users": h})

    g = (ds.map_batches(derive, batch_format="pyarrow")
         .groupby("bucket").map_groups(fold, batch_format="pandas")
         .to_pandas().groupby("band", as_index=False).sum())
    tot = int(g["n_users"].sum())
    g = g[g["n_users"] > 0].sort_values("band").reset_index(drop=True)
    g["share_bps"] = 10000 * g["n_users"].to_numpy(np.int64) // tot
    return g.astype("int64")


def embedding_norm_vs_doclen(sf_dir: str) -> pd.DataFrame:
    """NORM vs LENGTH — do longer documents get bigger vectors?
    Per 100-char length band (capped at band 9): document count and
    the truncating mean / min / max of the exact fixed-point squared
    norm Σ floor(v·1e6)² — unnormalized embeddings that scale with
    input length leak length into every cosine, the
    should-have-L2-normalized audit. Scale shape is the tagged-union
    ``id % 64`` hash join (vectors reduce to one (id, norm²) row
    per record before the exchange; documents ship (id, n_chars));
    bounded band partials per bucket. Pure integers."""
    emb = (_read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
           .map_batches(lambda t: pa.table({
               "k": t.column("vec_id").cast(pa.int64()),
               "n2": pa.array(
                   (np.floor(np.stack(t.column("embedding")
                                      .to_numpy(zero_copy_only=False))
                             .astype(np.float64) * 1e6)
                    .astype(np.int64) ** 2).sum(axis=1)),
               "len": pa.array(np.full(len(t), -1, np.int64)),
               "bucket": pc.cast(pc.bit_wise_and(
                   t.column("vec_id").cast(pa.int64()), 63),
                   pa.int32())}), batch_format="pyarrow"))
    doc = (_read(sf_dir, "documents", columns=["doc_id", "n_chars"])
           .map_batches(lambda t: pa.table({
               "k": t.column("doc_id").cast(pa.int64()),
               "n2": pa.array(np.full(len(t), -1, np.int64)),
               "len": t.column("n_chars").cast(pa.int64()),
               "bucket": pc.cast(pc.bit_wise_and(
                   t.column("doc_id").cast(pa.int64()), 63),
                   pa.int32())}), batch_format="pyarrow"))

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        left = g[g["len"] < 0][["k", "n2"]]
        right = g[g["len"] >= 0][["k", "len"]]
        m = left.merge(right, on="k")
        if m.empty:
            return pd.DataFrame(columns=["band", "n", "s", "mn",
                                         "mx"])
        band = np.minimum(m["len"].to_numpy(np.int64) // 100, 9)
        n2 = m["n2"].to_numpy(np.int64)
        out = pd.DataFrame({"band": band, "n2": n2}) \
            .groupby("band", as_index=False) \
            .agg(n=("n2", "size"), s=("n2", "sum"),
                 mn=("n2", "min"), mx=("n2", "max"))
        return out

    g = (emb.union(doc).groupby("bucket")
         .map_groups(fold, batch_format="pandas")
         .to_pandas().groupby("band", as_index=False)
         .agg(n=("n", "sum"), s=("s", "sum"), mn=("mn", "min"),
              mx=("mx", "max"))
         .sort_values("band").reset_index(drop=True))
    return pd.DataFrame({
        "len_band": g["band"].to_numpy(np.int64),
        "n_docs": g["n"].to_numpy(np.int64),
        "mean_norm2_fp": g["s"].to_numpy(np.int64)
        // g["n"].to_numpy(np.int64),
        "min_norm2_fp": g["mn"].to_numpy(np.int64),
        "max_norm2_fp": g["mx"].to_numpy(np.int64)}).astype("int64")


def nation_price_premium(sf_dir: str) -> pd.DataFrame:
    """NATION price premium — do suppliers from some nation
    systematically bill above the part's own average unit price?
    Pass A folds per-part unit-price sums/counts (truncating
    ``cents // qty`` units); pass B broadcasts that part-indexed
    table plus the supplier->nation LUT and scores every line's
    relative price 10000*uc*n_p // sum_p (floored per line, exactly
    mirrored in SQL), then averages per nation as a truncating
    milli mean of the floored per-line values. >10000 milli-mean =
    premium nation. Two passes, both ZERO row shuffle (part and
    supplier tables are dimension-sized broadcasts). Pure
    integers."""
    import ray

    def partialA(t: pa.Table) -> pa.Table:
        p = t.column("l_partkey").to_numpy().astype(np.int64)
        uc = (np.floor(t.column("l_extendedprice").to_numpy() * 100)
              .astype(np.int64)
              // np.floor(t.column("l_quantity").to_numpy())
              .astype(np.int64))
        pu, inv = np.unique(p, return_inverse=True)
        s = np.zeros(len(pu), np.int64)
        np.add.at(s, inv, uc)
        c = np.bincount(inv, minlength=len(pu)).astype(np.int64)
        return pa.table({"p": pa.array(pu), "s": pa.array(s),
                         "c": pa.array(c)})

    ds = _read(sf_dir, "lineitem",
               columns=["l_partkey", "l_suppkey", "l_extendedprice",
                        "l_quantity"])
    pg = (ds.map_batches(partialA, batch_format="pyarrow")
          .to_pandas().groupby("p")[["s", "c"]].sum())
    pmax = int(pg.index.max())
    psum = np.zeros(pmax + 1, np.int64)
    psum[pg.index.to_numpy()] = pg["s"].to_numpy(np.int64)
    pcnt = np.zeros(pmax + 1, np.int64)
    pcnt[pg.index.to_numpy()] = pg["c"].to_numpy(np.int64)
    supp = _read(sf_dir, "supplier",
                 columns=["s_suppkey", "s_nationkey"]).to_pandas()
    sk = supp["s_suppkey"].to_numpy(np.int64)
    s_nat = np.zeros(sk.max() + 1, np.int64)
    s_nat[sk] = supp["s_nationkey"].to_numpy(np.int64)
    refs = ray.put((psum, pcnt, s_nat))

    def partialB(t: pa.Table) -> pa.Table:
        psum_, pcnt_, s_nat_ = ray.get(refs)
        p = t.column("l_partkey").to_numpy().astype(np.int64)
        uc = (np.floor(t.column("l_extendedprice").to_numpy() * 100)
              .astype(np.int64)
              // np.floor(t.column("l_quantity").to_numpy())
              .astype(np.int64))
        nk = s_nat_[t.column("l_suppkey").to_numpy()
                    .astype(np.int64)]
        rel = 10000 * uc * pcnt_[p] // psum_[p]
        s = np.zeros(32, np.int64)
        np.add.at(s, nk, rel)
        c = np.bincount(nk, minlength=32).astype(np.int64)
        return pa.table({"k": pa.array(np.arange(32,
                                                 dtype=np.int64)),
                         "s": pa.array(s), "c": pa.array(c)})

    g = (ds.map_batches(partialB, batch_format="pyarrow")
         .to_pandas().groupby("k")[["s", "c"]].sum())
    nat = _read(sf_dir, "nation",
                columns=["n_nationkey", "n_name"]).to_pandas()
    names = dict(zip(nat["n_nationkey"].astype(int), nat["n_name"]))
    rows = []
    for k, row in g.iterrows():
        if int(row["c"]) == 0:
            continue
        rows.append((names[int(k)], int(row["c"]),
                     1000 * int(row["s"]) // int(row["c"])))
    rows.sort(key=lambda r: r[0])
    return pd.DataFrame(rows, columns=["nation", "n_lines",
                                       "rel_price_milli_bp"]) \
        .astype({"n_lines": "int64", "rel_price_milli_bp": "int64"})


def returns_by_quantity_band(sf_dir: str) -> pd.DataFrame:
    """RETURNS vs ORDER SIZE — are high-quantity lines returned
    more? Per 10-unit quantity band: line count, returned-flag
    share in exact bps and the lift vs the global return rate fully
    cross-multiplied — the bulk-buyer-remorse / damaged-in-bulk
    screen that decides whether quantity caps cut return costs.
    Per-block 10-cell partials — ZERO shuffle, pure integers."""
    ds = _read(sf_dir, "lineitem",
               columns=["l_quantity", "l_returnflag"])

    def partial(t: pa.Table) -> pa.Table:
        q = np.floor(t.column("l_quantity").to_numpy()) \
            .astype(np.int64)
        band = np.clip((q - 1) // 10, 0, 4)
        r = (np.asarray(t.column("l_returnflag").to_numpy(
            zero_copy_only=False)) == "R").astype(np.int64)
        cell = band * 2 + r
        c = np.bincount(cell, minlength=10).astype(np.int64)
        return pa.table({"cell": pa.array(np.arange(10,
                                                    dtype=np.int64)),
                         "c": pa.array(c)})

    g = (ds.map_batches(partial, batch_format="pyarrow")
         .to_pandas().groupby("cell")["c"].sum())
    cnt = np.zeros(10, dtype=np.int64)
    cnt[g.index.to_numpy()] = g.to_numpy()
    grid = cnt.reshape(5, 2)
    n_tot = int(grid.sum())
    r_tot = int(grid[:, 1].sum())
    rows = []
    for b in range(5):
        n = int(grid[b].sum())
        if n == 0:
            continue
        r = int(grid[b, 1])
        rows.append((b, n, r, 10000 * r // n,
                     1000 * r * n_tot // (n * r_tot) - 1000
                     if r_tot > 0 else -9999))
    return pd.DataFrame(rows, columns=["qty_band", "n_lines",
                                       "n_returned", "return_bps",
                                       "lift_milli"]) \
        .astype("int64")


def order_size_discount_curve(sf_dir: str) -> pd.DataFrame:
    """ORDER-SIZE discount curve — do orders with more lines carry
    deeper line discounts (negotiated-volume pricing) or is the
    discount dial independent of basket width? Per line-count band
    (1..6, 7+): order count, line count, and the exact truncating
    milli mean of the whole-percent line discount — read the curve
    top to bottom and a rising mean is the volume-discount story.
    One ``order % 64`` exchange of per-block (order, lines,
    discount-sum) partials; buckets fold and emit 7-cell grids.
    Pure integers."""
    ds = _read(sf_dir, "lineitem",
               columns=["l_orderkey", "l_discount"])

    def derive(t: pa.Table) -> pa.Table:
        o = t.column("l_orderkey").to_numpy().astype(np.int64)
        dp = np.floor(t.column("l_discount").to_numpy() * 100) \
            .astype(np.int64)
        ou, inv = np.unique(o, return_inverse=True)
        n = np.bincount(inv, minlength=len(ou)).astype(np.int64)
        s = np.zeros(len(ou), np.int64)
        np.add.at(s, inv, dp)
        return pa.table({"o": pa.array(ou), "n": pa.array(n),
                         "s": pa.array(s),
                         "bucket": pa.array((ou % 64)
                                            .astype(np.int32))})

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        ou, inv = np.unique(g["o"].to_numpy(np.int64),
                            return_inverse=True)
        n = np.zeros(len(ou), np.int64)
        np.add.at(n, inv, g["n"].to_numpy(np.int64))
        s = np.zeros(len(ou), np.int64)
        np.add.at(s, inv, g["s"].to_numpy(np.int64))
        band = np.minimum(n, 7) - 1
        no = np.bincount(band, minlength=7).astype(np.int64)
        nl = np.zeros(7, np.int64)
        np.add.at(nl, band, n)
        sd = np.zeros(7, np.int64)
        np.add.at(sd, band, s)
        return pd.DataFrame({"band": np.arange(7, dtype=np.int64),
                             "n_orders": no, "n_lines": nl,
                             "sum_disc": sd})

    g = (ds.map_batches(derive, batch_format="pyarrow")
         .groupby("bucket").map_groups(fold, batch_format="pandas")
         .to_pandas().groupby("band", as_index=False).sum())
    g = g[g["n_orders"] > 0].sort_values("band").reset_index(
        drop=True)
    out = pd.DataFrame({
        "line_band": g["band"].to_numpy(np.int64) + 1,
        "n_orders": g["n_orders"].to_numpy(np.int64),
        "n_lines": g["n_lines"].to_numpy(np.int64),
        "mean_disc_pct_milli": 1000 * g["sum_disc"]
        .to_numpy(np.int64) // g["n_lines"].to_numpy(np.int64)})
    return out.astype("int64")


def supplier_month_coverage(sf_dir: str) -> pd.DataFrame:
    """SUPPLY continuity census — of the 30-day months between a
    supplier's first and last shipment, how many saw at least one
    line ship? Suppliers band by the cross-multiplied coverage test
    (single-month suppliers separate, then <25%, <50%, <75%,
    >=75%): steady supply relationships vs sporadic spot buys — the
    supplier-axis sibling of ``user_coverage_census`` and the
    lead-time-model sanity gate. One ``supp % 64`` exchange of
    per-block distinct (supplier, month) rows; buckets fold span +
    distinct-month counts and emit 5-cell histograms. Pure
    integers."""
    ds = _read(sf_dir, "lineitem",
               columns=["l_suppkey", "l_shipdate"])

    def derive(t: pa.Table) -> pa.Table:
        s = t.column("l_suppkey").to_numpy().astype(np.int64)
        m = t.column("l_shipdate").cast(pa.int64()).to_numpy() \
            // _DAY_US // 30
        key = s * 4096 + (m % 4096)
        uk = np.unique(key)
        return pa.table({"s": pa.array(uk // 4096),
                         "m": pa.array(uk % 4096),
                         "bucket": pa.array(((uk // 4096) % 64)
                                            .astype(np.int32))})

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        key = g["s"].to_numpy(np.int64) * 4096 \
            + g["m"].to_numpy(np.int64)
        uk = np.unique(key)
        s = uk // 4096
        m = uk % 4096
        su, sinv = np.unique(s, return_inverse=True)
        act = np.bincount(sinv, minlength=len(su)).astype(np.int64)
        lo = np.full(len(su), np.iinfo(np.int64).max, np.int64)
        np.minimum.at(lo, sinv, m)
        hi = np.zeros(len(su), np.int64)
        np.maximum.at(hi, sinv, m)
        span = hi - lo + 1
        band = np.where(span == 1, 0,
                        np.where(100 * act < 25 * span, 1,
                                 np.where(100 * act < 50 * span, 2,
                                          np.where(100 * act
                                                   < 75 * span, 3,
                                                   4))))
        h = np.bincount(band, minlength=5).astype(np.int64)
        return pd.DataFrame({"band": np.arange(5, dtype=np.int64),
                             "n_suppliers": h})

    g = (ds.map_batches(derive, batch_format="pyarrow")
         .groupby("bucket").map_groups(fold, batch_format="pandas")
         .to_pandas().groupby("band", as_index=False).sum())
    tot = int(g["n_suppliers"].sum())
    g = g[g["n_suppliers"] > 0].sort_values("band").reset_index(
        drop=True)
    g["share_bps"] = 10000 * g["n_suppliers"].to_numpy(np.int64) \
        // tot
    return g.astype("int64")


def user_day_opening_type(sf_dir: str) -> pd.DataFrame:
    """OPENING MOVE census — the first event type of every
    (user, day): what do users actually open the product with, as
    shares in exact bps? The home-surface / notification-payload
    decision datum; diverges hard from the raw type mix when one
    type dominates later-in-session traffic. Endpoint defined by
    the total (ts, event_id) order. Per-block per-(user, day)
    first-candidate extraction (2 slim rows per key per block at
    most — never the stream) into one ``user % 64`` exchange;
    buckets lexsort and count. Pure integers."""
    ds = _read(sf_dir, "events",
               columns=["user_id", "ts", "event_id", "event_type"])

    def derive(t: pa.Table) -> pa.Table:
        u = t.column("user_id").to_numpy().astype(np.int64)
        ts = t.column("ts").cast(pa.int64()).to_numpy()
        e = t.column("event_id").to_numpy().astype(np.int64)
        d = ts // _DAY_US
        key = u * 32768 + (d % 32768)
        order = np.lexsort((e, ts, key))
        ks = key[order]
        first = np.ones(len(ks), dtype=bool)
        first[1:] = ks[1:] != ks[:-1]
        keep = order[first]
        return pa.table({"k": pa.array(key[keep]),
                         "ts": pa.array(ts[keep]),
                         "e": pa.array(e[keep]),
                         "typ": t.column("event_type").take(
                             pa.array(keep)),
                         "bucket": pa.array(((key[keep] // 32768)
                                             % 64).astype(np.int32))})

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        k = g["k"].to_numpy(np.int64)
        ts = g["ts"].to_numpy(np.int64)
        e = g["e"].to_numpy(np.int64)
        order = np.lexsort((e, ts, k))
        ks = k[order]
        first = np.ones(len(ks), dtype=bool)
        first[1:] = ks[1:] != ks[:-1]
        typ = g["typ"].to_numpy()[order][first]
        out = pd.DataFrame({"typ": typ}).groupby(
            "typ", as_index=False).size()
        return out.rename(columns={"size": "n"})

    g = (ds.map_batches(derive, batch_format="pyarrow")
         .groupby("bucket").map_groups(fold, batch_format="pandas")
         .to_pandas().groupby("typ", as_index=False)["n"].sum()
         .sort_values("typ").reset_index(drop=True))
    tot = int(g["n"].sum())
    return pd.DataFrame({"event_type": g["typ"],
                         "n_opens": g["n"].astype("int64"),
                         "share_bps": (10000
                                       * g["n"].to_numpy(np.int64)
                                       // tot)}).astype(
        {"n_opens": "int64", "share_bps": "int64"})


def part_assortment_churn(sf_dir: str) -> pd.DataFrame:
    """ASSORTMENT churn — split the shipping timeline at its
    midpoint day and classify every part ever sold: active in both
    halves, discontinued (first half only), introduced (second half
    only), with H1->H2 retention in exact bps. The catalog-stability
    number that separates a stable assortment from a
    churn-every-season one. Phase 1 is a constant-size min/max day
    aggregate; phase 2 folds per-block (part, any-H1, any-H2) flags
    on the driver (parts are dimension-sized) — ZERO row shuffle.
    Pure integers."""
    ds = _read(sf_dir, "lineitem",
               columns=["l_partkey", "l_shipdate"])

    def span(t: pa.Table) -> pa.Table:
        d = t.column("l_shipdate").cast(pa.int64()).to_numpy() \
            // _DAY_US
        return pa.table({"mn": pa.array([int(d.min())]),
                         "mx": pa.array([int(d.max())])})

    sp = ds.map_batches(span, batch_format="pyarrow").to_pandas()
    mid = (int(sp["mn"].min()) + int(sp["mx"].max())) // 2

    def partial(t: pa.Table) -> pa.Table:
        p = t.column("l_partkey").to_numpy().astype(np.int64)
        d = t.column("l_shipdate").cast(pa.int64()).to_numpy() \
            // _DAY_US
        pu, inv = np.unique(p, return_inverse=True)
        h1 = np.zeros(len(pu), np.int64)
        np.maximum.at(h1, inv, (d <= mid).astype(np.int64))
        h2 = np.zeros(len(pu), np.int64)
        np.maximum.at(h2, inv, (d > mid).astype(np.int64))
        return pa.table({"p": pa.array(pu), "h1": pa.array(h1),
                         "h2": pa.array(h2)})

    g = (ds.map_batches(partial, batch_format="pyarrow")
         .to_pandas().groupby("p")[["h1", "h2"]].max())
    h1 = g["h1"].to_numpy(np.int64)
    h2 = g["h2"].to_numpy(np.int64)
    n_both = int((h1 & h2).sum())
    n_h1 = int(((h1 == 1) & (h2 == 0)).sum())
    n_h2 = int(((h1 == 0) & (h2 == 1)).sum())
    return pd.DataFrame(
        [(len(g), n_both, n_h1, n_h2,
          10000 * n_both // (n_both + n_h1))],
        columns=["n_parts_sold", "n_both", "n_only_h1",
                 "n_only_h2", "retention_bps"]).astype("int64")


def customer_activity_balance_gamma(sf_dir: str) -> pd.DataFrame:
    """ACTIVITY × BALANCE association, demand side — do frequent
    buyers carry higher account balances? Goodman-Kruskal gamma
    between each customer's order count (capped at 1000 levels;
    zero-order customers included) and its balance in fixed $100
    bands, via the same exact 2D suffix-sum grid algebra as the
    supplier-side twin ``supplier_activity_balance_gamma`` — the
    SQL twin pairs the bounded GRID CELLS weighted by count
    products (customers are too many to pair directly). Per-block
    customer-count partials + one dimension read; ZERO shuffle,
    pure integers."""
    def partial(t: pa.Table) -> pa.Table:
        u, c = np.unique(t.column("o_custkey").to_numpy()
                         .astype(np.int64), return_counts=True)
        return pa.table({"k": pa.array(u),
                         "c": pa.array(c.astype(np.int64))})

    act = (_read(sf_dir, "orders", columns=["o_custkey"])
           .map_batches(partial, batch_format="pyarrow")
           .to_pandas().groupby("k")["c"].sum())
    cust = _read(sf_dir, "customer",
                 columns=["c_custkey", "c_acctbal"]).to_pandas()
    cnt = cust["c_custkey"].map(act).fillna(0).to_numpy(np.int64)
    a = np.minimum(cnt, 1000)
    cents = np.floor(cust["c_acctbal"].to_numpy() * 100) \
        .astype(np.int64)
    b = (cents + 100000) // 10000
    na, nb = 1001, 110
    grid = np.zeros((na, nb), dtype=np.int64)
    np.add.at(grid, (a, b), 1)
    gt = np.zeros((na + 1, nb + 1), dtype=object)
    for i in range(na - 1, -1, -1):
        for j in range(nb - 1, -1, -1):
            gt[i][j] = (int(grid[i][j]) + gt[i + 1][j]
                        + gt[i][j + 1] - gt[i + 1][j + 1])
    conc = 0
    disc = 0
    for i, j in zip(*np.nonzero(grid)):
        nij = int(grid[i][j])
        conc += nij * int(gt[i + 1][j + 1])
        lower = gt[i + 1][0] - gt[i + 1][j] if j > 0 else 0
        disc += nij * int(lower)
    tot = conc + disc
    sgn = 1 if conc >= disc else -1
    gamma_milli = sgn * (1000 * abs(conc - disc) // tot) \
        if tot > 0 else 0
    return pd.DataFrame(
        [(len(cust), int((cnt > 0).sum()), conc, disc,
          gamma_milli)],
        columns=["n_customers", "n_active", "concordant_pairs",
                 "discordant_pairs", "gamma_milli"]).astype("int64")


def user_daily_intensity_census(sf_dir: str) -> pd.DataFrame:
    """DAILY-INTENSITY census — value per ACTIVE day, not per
    calendar day: each user's total event value cents divided
    (truncating) by their distinct active days, banded into fixed
    cent bands with shares in exact bps. Separates the
    shows-up-rarely-but-spends-big whale from the daily grazer at
    equal lifetime value — the complement to tenure-coverage. One
    ``user % 64`` exchange of per-block (user, day, cents) rollups;
    buckets fold distinct days + value sums vectorized into 5-cell
    histograms. Pure integers."""
    ds = _read(sf_dir, "events", columns=["user_id", "ts", "value"])

    def derive(t: pa.Table) -> pa.Table:
        u = t.column("user_id").to_numpy().astype(np.int64)
        d = t.column("ts").cast(pa.int64()).to_numpy() // _DAY_US
        cents = np.floor(t.column("value").to_numpy() * 100) \
            .astype(np.int64)
        key = u * 32768 + (d % 32768)
        uk, inv = np.unique(key, return_inverse=True)
        s = np.zeros(len(uk), np.int64)
        np.add.at(s, inv, cents)
        return pa.table({"u": pa.array(uk // 32768),
                         "d": pa.array(uk % 32768),
                         "s": pa.array(s),
                         "bucket": pa.array(((uk // 32768) % 64)
                                            .astype(np.int32))})

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        key = g["u"].to_numpy(np.int64) * 32768 \
            + g["d"].to_numpy(np.int64)
        uk, inv = np.unique(key, return_inverse=True)
        s = np.zeros(len(uk), np.int64)
        np.add.at(s, inv, g["s"].to_numpy(np.int64))
        uu, uinv = np.unique(uk // 32768, return_inverse=True)
        days = np.bincount(uinv, minlength=len(uu)).astype(np.int64)
        tv = np.zeros(len(uu), np.int64)
        np.add.at(tv, uinv, s)
        inten = tv // days
        band = np.where(inten == 0, 0,
                        np.where(inten < 1000, 1,
                                 np.where(inten < 5000, 2,
                                          np.where(inten < 20000, 3,
                                                   4))))
        h = np.bincount(band, minlength=5).astype(np.int64)
        return pd.DataFrame({"band": np.arange(5, dtype=np.int64),
                             "n_users": h})

    g = (ds.map_batches(derive, batch_format="pyarrow")
         .groupby("bucket").map_groups(fold, batch_format="pandas")
         .to_pandas().groupby("band", as_index=False).sum())
    tot = int(g["n_users"].sum())
    g = g[g["n_users"] > 0].sort_values("band").reset_index(
        drop=True)
    g["share_bps"] = 10000 * g["n_users"].to_numpy(np.int64) // tot
    return g.astype("int64")


def customer_order_momentum(sf_dir: str) -> pd.DataFrame:
    """ORDER momentum — does a big order predict a bigger next one?
    Every CONSECUTIVE strictly-ordered (date, orderkey) order pair
    within a customer votes: value up, down, or exactly flat
    (cents-equal), pooled into up/down/flat counts with the up
    share among movers in exact bps and the sign-normalized
    momentum gamma. Mean-reverting books show up < 5000 bps. One
    ``cust % 64`` exchange of slim (customer, day, orderkey, cents)
    rows; buckets lexsort once and compare adjacent same-customer
    rows vectorized. Pure integers."""
    ds = _read(sf_dir, "orders",
               columns=["o_custkey", "o_orderdate", "o_orderkey",
                        "o_totalprice"])

    def derive(t: pa.Table) -> pa.Table:
        c = t.column("o_custkey").to_numpy().astype(np.int64)
        return pa.table({
            "c": pa.array(c),
            "d": pa.array(t.column("o_orderdate").cast(pa.int64())
                          .to_numpy() // _DAY_US),
            "k": t.column("o_orderkey").cast(pa.int64()),
            "v": pa.array(np.floor(t.column("o_totalprice")
                                   .to_numpy() * 100)
                          .astype(np.int64)),
            "bucket": pa.array((c % 64).astype(np.int32))})

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        c = g["c"].to_numpy(np.int64)
        d = g["d"].to_numpy(np.int64)
        k = g["k"].to_numpy(np.int64)
        v = g["v"].to_numpy(np.int64)
        order = np.lexsort((k, d, c))
        cs, vs = c[order], v[order]
        same = cs[1:] == cs[:-1]
        dv = vs[1:] - vs[:-1]
        up = int(((dv > 0) & same).sum())
        dn = int(((dv < 0) & same).sum())
        fl = int(((dv == 0) & same).sum())
        return pd.DataFrame([(up, dn, fl)],
                            columns=["up", "dn", "fl"])

    g = (ds.map_batches(derive, batch_format="pyarrow")
         .groupby("bucket").map_groups(fold, batch_format="pandas")
         .to_pandas().sum())
    up, dn, fl = int(g["up"]), int(g["dn"]), int(g["fl"])
    movers = up + dn
    sgn = 1 if up >= dn else -1
    gamma_milli = sgn * (1000 * abs(up - dn) // movers) \
        if movers > 0 else 0
    return pd.DataFrame(
        [(up + dn + fl, up, dn, fl,
          10000 * up // movers if movers > 0 else -9999,
          gamma_milli)],
        columns=["n_pairs", "n_up", "n_down", "n_flat",
                 "up_share_bps", "momentum_gamma_milli"]) \
        .astype("int64")


def revenue_inequality_decomposition(sf_dir: str) -> pd.DataFrame:
    """GINI decomposition by nation — how much of customer revenue
    inequality lives WITHIN nations vs BETWEEN them? Per ordering
    customer: total order cents; the exact pairwise-difference mass
    S = Σ(2i-n-1)·x_(i) (tie-stable) gives the overall Gini in
    milli as 1000·S // (2·n·T), and the same formula per nation
    splits S into a within-nation part and the between remainder —
    if between dominates, go-to-market is a geography problem, not
    a customer-mix one. Per-block customer-revenue partials folded
    on the driver (customers are dimension-sized) + the
    customer->nation dimension read; ZERO row shuffle. Pure
    integers."""
    def partial(t: pa.Table) -> pa.Table:
        u, inv = np.unique(t.column("o_custkey").to_numpy()
                           .astype(np.int64), return_inverse=True)
        s = np.zeros(len(u), np.int64)
        np.add.at(s, inv, np.floor(t.column("o_totalprice")
                                   .to_numpy() * 100)
                  .astype(np.int64))
        return pa.table({"k": pa.array(u), "s": pa.array(s)})

    rev = (_read(sf_dir, "orders",
                 columns=["o_custkey", "o_totalprice"])
           .map_batches(partial, batch_format="pyarrow")
           .to_pandas().groupby("k")["s"].sum())
    cust = _read(sf_dir, "customer",
                 columns=["c_custkey", "c_nationkey"]).to_pandas()
    nat = cust.set_index("c_custkey")["c_nationkey"]
    x = rev.to_numpy(np.int64)
    nk = nat.loc[rev.index].to_numpy(np.int64)

    def smass(vals: np.ndarray) -> int:
        v = np.sort(vals)
        n = len(v)
        w = 2 * np.arange(1, n + 1, dtype=np.int64) - n - 1
        return int(np.dot(w, v))

    n = len(x)
    tot = int(x.sum())
    s_all = smass(x)
    s_within = sum(smass(x[nk == k]) for k in np.unique(nk))
    gini_milli = 1000 * s_all // (2 * n * tot) if tot > 0 else 0
    return pd.DataFrame(
        [(n, tot, gini_milli,
          1000 * s_within // s_all if s_all > 0 else 0,
          1000 * (s_all - s_within) // s_all if s_all > 0 else 0)],
        columns=["n_customers", "total_cents", "gini_milli",
                 "within_share_milli", "between_share_milli"]) \
        .astype("int64")


def event_type_launch_profile(sf_dir: str) -> pd.DataFrame:
    """LAUNCH profile — when did each event type first appear in
    the stream, and how fast did it ramp? Per type: first/last
    epoch day, lifetime span, total events, events in the type's
    own first 7 days, and that launch-week share in exact bps. A
    type that "launched" mid-stream is a feature flag or a schema
    migration — the contract-evolution audit every
    consumer-of-events needs before assuming types are stationary.
    Per-block (type, day) count partials folded on the driver
    (type × day is bounded); ZERO shuffle, pure integers."""
    ds = _read(sf_dir, "events", columns=["event_type", "ts"])

    def partial(t: pa.Table) -> pa.Table:
        d = t.column("ts").cast(pa.int64()).to_numpy() // _DAY_US
        df = pd.DataFrame({"typ": t.column("event_type")
                           .to_pylist(), "d": d})
        g = df.groupby(["typ", "d"], as_index=False).size()
        return pa.Table.from_pandas(
            g.rename(columns={"size": "n"}), preserve_index=False)

    g = (ds.map_batches(partial, batch_format="pyarrow")
         .to_pandas().groupby(["typ", "d"], as_index=False)["n"]
         .sum())
    rows = []
    for typ in sorted(g["typ"].unique()):
        sub = g[g["typ"] == typ]
        d = sub["d"].to_numpy(np.int64)
        n = sub["n"].to_numpy(np.int64)
        first, last = int(d.min()), int(d.max())
        tot = int(n.sum())
        week = int(n[d <= first + 6].sum())
        rows.append((typ, first, last, last - first + 1, tot, week,
                     10000 * week // tot))
    out = pd.DataFrame(rows, columns=["event_type", "first_day",
                                      "last_day", "span_days",
                                      "n_events", "n_first_week",
                                      "launch_week_bps"])
    for c in out.columns[1:]:
        out[c] = out[c].astype("int64")
    return out


def linestatus_boundary_audit(sf_dir: str) -> pd.DataFrame:
    """LINESTATUS boundary audit — the O/F flag is supposed to be a
    pure function of ship date (open vs fulfilled as of the data's
    cut date). Per status: line count and min/max epoch ship day;
    plus the overlap width in days between the latest F and the
    earliest O (positive overlap = the flag is NOT derivable from
    the date — downstream incremental loaders keyed on status will
    double-process the boundary). Per-block constant-cell partials —
    ZERO shuffle, pure integers."""
    ds = _read(sf_dir, "lineitem",
               columns=["l_linestatus", "l_shipdate"])

    def partial(t: pa.Table) -> pa.Table:
        d = t.column("l_shipdate").cast(pa.int64()).to_numpy() \
            // _DAY_US
        df = pd.DataFrame({"st": t.column("l_linestatus")
                           .to_pylist(), "d": d})
        g = df.groupby("st").agg(n=("d", "size"), mn=("d", "min"),
                                 mx=("d", "max")).reset_index()
        return pa.Table.from_pandas(g, preserve_index=False)

    g = (ds.map_batches(partial, batch_format="pyarrow")
         .to_pandas().groupby("st")
         .agg(n=("n", "sum"), mn=("mn", "min"), mx=("mx", "max")))
    stats = {st: (int(r["n"]), int(r["mn"]), int(r["mx"]))
             for st, r in g.iterrows()}
    overlap = -1
    if "F" in stats and "O" in stats:
        overlap = stats["F"][2] - stats["O"][1] + 1
    rows = [(st, *stats[st], overlap) for st in sorted(stats)]
    return pd.DataFrame(rows, columns=["linestatus", "n_lines",
                                       "min_day", "max_day",
                                       "overlap_days"]).astype(
        {"n_lines": "int64", "min_day": "int64", "max_day": "int64",
         "overlap_days": "int64"})


def ship_before_order_audit(sf_dir: str) -> pd.DataFrame:
    """TEMPORAL integrity — does any line SHIP before its order was
    placed? Joins lineitem ship days to orders order days on
    orderkey and reports line count, violations (ship < order),
    violation share in exact bps, and the min/max ship-minus-order
    lag in days. A negative-lag cluster is a timezone bug or a
    backdated import — either poisons every lead-time model
    downstream. Scale shape is the tagged-union ``order % 64`` hash
    join (orders ship one (key, day) row, lineitem ships (key,
    ship-day) rows; buckets merge vectorized). Pure integers."""
    li = (_read(sf_dir, "lineitem",
                columns=["l_orderkey", "l_shipdate"])
          .map_batches(lambda t: pa.table({
              "k": t.column("l_orderkey").cast(pa.int64()),
              "d": pa.array(t.column("l_shipdate").cast(pa.int64())
                            .to_numpy() // _DAY_US),
              "tag": pa.array(np.ones(len(t), np.int64)),
              "bucket": pc.cast(pc.bit_wise_and(
                  t.column("l_orderkey").cast(pa.int64()), 63),
                  pa.int32())}), batch_format="pyarrow"))
    od = (_read(sf_dir, "orders",
                columns=["o_orderkey", "o_orderdate"])
          .map_batches(lambda t: pa.table({
              "k": t.column("o_orderkey").cast(pa.int64()),
              "d": pa.array(t.column("o_orderdate").cast(pa.int64())
                            .to_numpy() // _DAY_US),
              "tag": pa.array(np.zeros(len(t), np.int64)),
              "bucket": pc.cast(pc.bit_wise_and(
                  t.column("o_orderkey").cast(pa.int64()), 63),
                  pa.int32())}), batch_format="pyarrow"))

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        o = g[g["tag"] == 0][["k", "d"]].rename(
            columns={"d": "od"})
        l_ = g[g["tag"] == 1][["k", "d"]]
        m = l_.merge(o, on="k")
        lag = m["d"].to_numpy(np.int64) - m["od"].to_numpy(np.int64)
        if len(lag) == 0:
            return pd.DataFrame(columns=["n", "viol", "mn", "mx"])
        return pd.DataFrame([(len(lag), int((lag < 0).sum()),
                              int(lag.min()), int(lag.max()))],
                            columns=["n", "viol", "mn", "mx"])

    g = (li.union(od).groupby("bucket")
         .map_groups(fold, batch_format="pandas").to_pandas())
    n = int(g["n"].sum())
    viol = int(g["viol"].sum())
    return pd.DataFrame(
        [(n, viol, 10000 * viol // n, int(g["mn"].min()),
          int(g["mx"].max()))],
        columns=["n_lines", "n_violations", "violation_bps",
                 "min_lag_days", "max_lag_days"]).astype("int64")


def ship_dow_profile(sf_dir: str) -> pd.DataFrame:
    """SHIP day-of-week profile — which weekdays does the warehouse
    actually ship on? Per dow (0=Sunday under the (epoch_day+4)%7
    convention): line count, share in exact bps, and gross revenue
    cents. A flat profile means continuous fulfilment; deep weekend
    valleys mean SLA clocks should count business days. Per-block
    7-cell partials — ZERO shuffle, pure integers."""
    ds = _read(sf_dir, "lineitem",
               columns=["l_shipdate", "l_extendedprice"])

    def partial(t: pa.Table) -> pa.Table:
        d = t.column("l_shipdate").cast(pa.int64()).to_numpy() \
            // _DAY_US
        w = (d + 4) % 7
        cents = np.floor(t.column("l_extendedprice").to_numpy()
                         * 100).astype(np.int64)
        n = np.bincount(w, minlength=7).astype(np.int64)
        s = np.zeros(7, np.int64)
        np.add.at(s, w, cents)
        return pa.table({"dow": pa.array(np.arange(7,
                                                   dtype=np.int64)),
                         "n": pa.array(n), "s": pa.array(s)})

    g = (ds.map_batches(partial, batch_format="pyarrow")
         .to_pandas().groupby("dow", as_index=False)[["n", "s"]]
         .sum().sort_values("dow").reset_index(drop=True))
    g = g[g["n"] > 0]
    tot = int(g["n"].sum())
    return pd.DataFrame({
        "dow": g["dow"].to_numpy(np.int64),
        "n_lines": g["n"].to_numpy(np.int64),
        "share_bps": 10000 * g["n"].to_numpy(np.int64) // tot,
        "gross_cents": g["s"].to_numpy(np.int64)}).astype("int64")


def event_type_intraday_cadence(sf_dir: str) -> pd.DataFrame:
    """INTRADAY cadence — within a calendar day, how tightly do
    arrivals of each event type pack? Consecutive same-(type, day)
    gaps under the total (ts, event_id) order, floored to whole
    seconds: per type the gap count, exact ceil-rank p50 gap and
    truncating milli mean — the alerting-threshold datum (a page on
    "no signup for 10 minutes" needs the real cadence, not the
    daily average). One ``day % 64`` exchange of slim (type, day,
    ts, id) rows; buckets lexsort once, diff adjacent, and emit
    bounded (type, gap-second) cell counts. Pure integers."""
    ds = _read(sf_dir, "events",
               columns=["event_type", "ts", "event_id"])

    def derive(t: pa.Table) -> pa.Table:
        ts = t.column("ts").cast(pa.int64()).to_numpy()
        d = ts // _DAY_US
        return pa.table({"typ": t.column("event_type"),
                         "d": pa.array(d), "ts": pa.array(ts),
                         "e": t.column("event_id").cast(pa.int64()),
                         "bucket": pa.array((d % 64)
                                            .astype(np.int32))})

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        typ, tcode = np.unique(g["typ"].to_numpy(),
                               return_inverse=True)
        d = g["d"].to_numpy(np.int64)
        ts = g["ts"].to_numpy(np.int64)
        e = g["e"].to_numpy(np.int64)
        order = np.lexsort((e, ts, d, tcode))
        tc, dd, tss = tcode[order], d[order], ts[order]
        same = (tc[1:] == tc[:-1]) & (dd[1:] == dd[:-1])
        gap = (tss[1:] - tss[:-1]) // 1_000_000
        out = pd.DataFrame({"typ": typ[tc[1:][same]],
                            "gap": gap[same]})
        r = out.groupby(["typ", "gap"], as_index=False).size()
        return r.rename(columns={"size": "c"})

    g = (ds.map_batches(derive, batch_format="pyarrow")
         .groupby("bucket").map_groups(fold, batch_format="pandas")
         .to_pandas().groupby(["typ", "gap"], as_index=False)["c"]
         .sum())
    rows = []
    for typ in sorted(g["typ"].unique()):
        sub = g[g["typ"] == typ].sort_values("gap")
        n = int(sub["c"].sum())
        s = int((sub["gap"].to_numpy(np.int64)
                 * sub["c"].to_numpy(np.int64)).sum())
        cum = sub["c"].cumsum().to_numpy(np.int64)
        rank = (50 * n + 99) // 100
        p50 = int(sub["gap"].to_numpy(np.int64)[
            np.searchsorted(cum, rank)])
        rows.append((typ, n, p50, 1000 * s // n))
    out = pd.DataFrame(rows, columns=["event_type", "n_gaps",
                                      "p50_gap_s",
                                      "mean_gap_milli_s"])
    for c in out.columns[1:]:
        out[c] = out[c].astype("int64")
    return out


def status_priority_mix(sf_dir: str) -> pd.DataFrame:
    """STATUS × PRIORITY mix — do urgent orders clear the pipeline
    faster (over-represented among fulfilled) or pile up open? Per
    (orderstatus, priority digit) cell: order count, the
    within-status share in exact bps, and the lift vs the global
    priority mix cross-multiplied as 1000*o*N // (r*c) - 1000.
    Per-block constant-cell partials — ZERO shuffle, pure
    integers."""
    ds = _read(sf_dir, "orders",
               columns=["o_orderstatus", "o_orderpriority"])

    def partial(t: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "st": t.column("o_orderstatus").to_pylist(),
            "p": pc.utf8_slice_codeunits(
                t.column("o_orderpriority"), 0, 1)
            .cast(pa.int64()).to_numpy()})
        g = df.groupby(["st", "p"], as_index=False).size()
        return pa.Table.from_pandas(
            g.rename(columns={"size": "n"}), preserve_index=False)

    g = (ds.map_batches(partial, batch_format="pyarrow")
         .to_pandas().groupby(["st", "p"], as_index=False)["n"]
         .sum())
    n_tot = int(g["n"].sum())
    rn = g.groupby("st")["n"].sum()
    cn = g.groupby("p")["n"].sum()
    g = g.sort_values(["st", "p"], kind="mergesort") \
        .reset_index(drop=True)
    n = g["n"].to_numpy(np.int64)
    r = rn.loc[g["st"]].to_numpy(np.int64)
    c = cn.loc[g["p"]].to_numpy(np.int64)
    return pd.DataFrame({
        "orderstatus": g["st"], "priority": g["p"].astype("int64"),
        "n_orders": n, "status_share_bps": 10000 * n // r,
        "lift_milli": 1000 * n * n_tot // (r * c) - 1000}).astype(
        {"priority": "int64", "n_orders": "int64",
         "status_share_bps": "int64", "lift_milli": "int64"})


def tax_uniformity_by_nation(sf_dir: str) -> pd.DataFrame:
    """TAX uniformity — is the whole-percent tax mix identical
    across supplier nations, as a single global tax policy implies?
    Per nation: line count, exact truncating milli mean tax percent,
    and the chi-square distance of that nation's 9-level tax mix
    against the GLOBAL mix as the sum of per-cell micro
    contributions (N·O - N_n·C_t)²·1e6 // (N·N_n·C_t), each floored
    in exact arbitrary-precision integers. A nation that sticks out
    is a jurisdiction rule or a data bug — either way the compliance
    team looks. Supplier->nation LUT broadcast; per-block
    (nation, tax-level) constant-cell partials — ZERO row shuffle."""
    import ray

    supp = _read(sf_dir, "supplier",
                 columns=["s_suppkey", "s_nationkey"]).to_pandas()
    sk = supp["s_suppkey"].to_numpy(np.int64)
    lut = np.zeros(sk.max() + 1, dtype=np.int64)
    lut[sk] = supp["s_nationkey"].to_numpy(np.int64)
    ref = ray.put(lut)

    ds = _read(sf_dir, "lineitem", columns=["l_suppkey", "l_tax"])

    def partial(t: pa.Table) -> pa.Table:
        lut_ = ray.get(ref)
        nk = lut_[t.column("l_suppkey").to_numpy().astype(np.int64)]
        tx = np.floor(t.column("l_tax").to_numpy() * 100) \
            .astype(np.int64)
        cell = nk * 16 + tx
        c = np.bincount(cell, minlength=32 * 16).astype(np.int64)
        return pa.table({
            "cell": pa.array(np.arange(len(c), dtype=np.int64)),
            "c": pa.array(c)})

    g = (ds.map_batches(partial, batch_format="pyarrow")
         .to_pandas().groupby("cell")["c"].sum())
    grid = np.zeros(32 * 16, dtype=np.int64)
    grid[g.index.to_numpy()] = g.to_numpy()
    grid = grid.reshape(32, 16)
    big_n = int(grid.sum())
    col = grid.sum(axis=0)
    nat = _read(sf_dir, "nation",
                columns=["n_nationkey", "n_name"]).to_pandas()
    names = dict(zip(nat["n_nationkey"].astype(int), nat["n_name"]))
    rows = []
    for k in sorted(names, key=lambda k: names[k]):
        nn = int(grid[k].sum())
        if nn == 0:
            continue
        mean_milli = 1000 * int((grid[k]
                                 * np.arange(16, dtype=np.int64))
                                .sum()) // nn
        chi2 = 0
        for tx in range(16):
            ct = int(col[tx])
            if ct == 0:
                continue
            num = big_n * int(grid[k, tx]) - nn * ct
            chi2 += num * num * 1000000 // (big_n * nn * ct)
        rows.append((names[k], nn, mean_milli, chi2))
    out = pd.DataFrame(rows, columns=["nation", "n_lines",
                                      "mean_tax_pct_milli",
                                      "chi2_micro"])
    for c2 in out.columns[1:]:
        out[c2] = out[c2].astype("int64")
    return out


def event_id_day_monotonicity(sf_dir: str) -> pd.DataFrame:
    """INGESTION-ORDER audit — do event ids advance with calendar
    days? Per day the id range folds to (min, max); a day whose min
    id undercuts the previous day's max means the id sequence and
    event time disagree (late arrivals, clock skew, or a replayed
    batch) — exactly what breaks naive "resume from max id"
    loaders. Reports days, overlapping-boundary count and share in
    exact bps, and the worst undercut depth in id units. Per-block
    (day, min, max) partials folded on the driver (days are
    bounded); ZERO shuffle, pure integers."""
    ds = _read(sf_dir, "events", columns=["ts", "event_id"])

    def partial(t: pa.Table) -> pa.Table:
        d = t.column("ts").cast(pa.int64()).to_numpy() // _DAY_US
        e = t.column("event_id").to_numpy().astype(np.int64)
        du, inv = np.unique(d, return_inverse=True)
        mn = np.full(len(du), np.iinfo(np.int64).max, np.int64)
        np.minimum.at(mn, inv, e)
        mx = np.zeros(len(du), np.int64)
        np.maximum.at(mx, inv, e)
        return pa.table({"d": pa.array(du), "mn": pa.array(mn),
                         "mx": pa.array(mx)})

    g = (ds.map_batches(partial, batch_format="pyarrow")
         .to_pandas().groupby("d")
         .agg(mn=("mn", "min"), mx=("mx", "max")).sort_index())
    mn = g["mn"].to_numpy(np.int64)
    mx = g["mx"].to_numpy(np.int64)
    undercut = mx[:-1] - mn[1:]
    n_bad = int((undercut > 0).sum())
    worst = int(undercut.max()) if len(undercut) else 0
    n_days = len(g)
    return pd.DataFrame(
        [(n_days, n_days - 1, n_bad,
          10000 * n_bad // (n_days - 1) if n_days > 1 else 0,
          max(worst, 0))],
        columns=["n_days", "n_boundaries", "n_overlaps",
                 "overlap_bps", "worst_undercut"]).astype("int64")


def segment_one_and_done(sf_dir: str) -> pd.DataFrame:
    """ONE-AND-DONE census by segment — of each market segment's
    customers: how many never ordered, how many ordered exactly
    once and stopped, how many came back? Single-order share (among
    ordering customers) in exact bps plus its lift vs the global
    single rate cross-multiplied — the retention-problem locator
    that says WHERE the funnel leaks, not just that it leaks.
    Per-block customer-order-count partials folded on the driver
    (customers are dimension-sized) + one dimension read; ZERO row
    shuffle. Pure integers."""
    def partial(t: pa.Table) -> pa.Table:
        u, c = np.unique(t.column("o_custkey").to_numpy()
                         .astype(np.int64), return_counts=True)
        return pa.table({"k": pa.array(u),
                         "c": pa.array(c.astype(np.int64))})

    act = (_read(sf_dir, "orders", columns=["o_custkey"])
           .map_batches(partial, batch_format="pyarrow")
           .to_pandas().groupby("k")["c"].sum())
    cust = _read(sf_dir, "customer",
                 columns=["c_custkey", "c_mktsegment"]).to_pandas()
    cnt = cust["c_custkey"].map(act).fillna(0).to_numpy(np.int64)
    seg = cust["c_mktsegment"].to_numpy()
    tot_single = int((cnt == 1).sum())
    tot_ordering = int((cnt > 0).sum())
    rows = []
    for s in sorted(pd.unique(seg)):
        m = seg == s
        n = int(m.sum())
        never = int((cnt[m] == 0).sum())
        single = int((cnt[m] == 1).sum())
        multi = n - never - single
        ordering = n - never
        lift = (1000 * single * tot_ordering
                // (ordering * tot_single) - 1000
                if ordering > 0 and tot_single > 0 else -9999)
        rows.append((s, n, never, single, multi,
                     10000 * single // ordering if ordering > 0
                     else -9999, lift))
    out = pd.DataFrame(rows, columns=["segment", "n_customers",
                                      "n_never", "n_single",
                                      "n_multi", "single_bps",
                                      "lift_milli"])
    for c2 in out.columns[1:]:
        out[c2] = out[c2].astype("int64")
    return out


def user_spend_maturation(sf_dir: str) -> pd.DataFrame:
    """SPEND maturation — do users spend more per event as they
    mature? Each user's event sequence (total (ts, event_id) order)
    splits at n//2; the halves' mean cents compare EXACTLY via the
    cross-multiplied s2*n1 vs s1*n2 test (no division), pooling
    users into up / down / flat with the up share among movers in
    exact bps. Rising = habit formation; falling = novelty decay —
    the LTV-curve shape read without a single float. One
    ``user % 64`` exchange of slim (user, ts, id, cents) rows;
    buckets lexsort once and fold per-user halves vectorized via
    cumulative sums. Pure integers."""
    ds = _read(sf_dir, "events",
               columns=["user_id", "ts", "event_id", "value"])

    def derive(t: pa.Table) -> pa.Table:
        u = t.column("user_id").to_numpy().astype(np.int64)
        return pa.table({
            "u": pa.array(u),
            "ts": t.column("ts").cast(pa.int64()),
            "e": t.column("event_id").cast(pa.int64()),
            "v": pa.array(np.floor(t.column("value").to_numpy()
                                   * 100).astype(np.int64)),
            "bucket": pa.array((u % 64).astype(np.int32))})

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        u = g["u"].to_numpy(np.int64)
        order = np.lexsort((g["e"].to_numpy(np.int64),
                            g["ts"].to_numpy(np.int64), u))
        us = u[order]
        v = g["v"].to_numpy(np.int64)[order]
        uu, start = np.unique(us, return_index=True)
        n = np.diff(np.append(start, len(us)))
        cs = np.concatenate(([0], np.cumsum(v)))
        n1 = n // 2
        s_tot = cs[start + n] - cs[start]
        s1 = cs[start + n1] - cs[start]
        s2 = s_tot - s1
        n2 = n - n1
        multi = n >= 2
        lhs = s2[multi] * n1[multi]
        rhs = s1[multi] * n2[multi]
        return pd.DataFrame(
            [(int(multi.sum()), int((lhs > rhs).sum()),
              int((lhs < rhs).sum()), int((lhs == rhs).sum()))],
            columns=["n_multi", "up", "dn", "fl"])

    g = (ds.map_batches(derive, batch_format="pyarrow")
         .groupby("bucket").map_groups(fold, batch_format="pandas")
         .to_pandas().sum())
    up, dn, fl = int(g["up"]), int(g["dn"]), int(g["fl"])
    movers = up + dn
    return pd.DataFrame(
        [(int(g["n_multi"]), up, dn, fl,
          10000 * up // movers if movers > 0 else -9999)],
        columns=["n_users_multi", "n_up", "n_down", "n_flat",
                 "up_share_bps"]).astype("int64")


def part_three_way_independence(sf_dir: str) -> pd.DataFrame:
    """THREE-WAY independence — is the catalog's (brand, type,
    size) composition just the product of its three margins, or are
    attributes entangled? Chi-square against MUTUAL independence
    E = r·c·d / N², each cell floored as
    1000·(N²·O − r·c·d)² // (N²·r·c·d) in exact arbitrary-precision
    integers (HUGEINT twin), with df = rct·(margins−1) product and
    the occupied-cell count. Entangled attributes mean
    stratified sampling on one axis silently skews the others. One
    bounded 3D bincount partial per block — ZERO shuffle."""
    ds = _read(sf_dir, "part",
               columns=["p_brand", "p_type", "p_size"])

    def partial(t: pa.Table) -> pa.Table:
        df = pd.DataFrame({"b": t.column("p_brand").to_pylist(),
                           "t": t.column("p_type").to_pylist(),
                           "s": t.column("p_size").to_numpy()
                           .astype(np.int64)})
        g = df.groupby(["b", "t", "s"], as_index=False).size()
        return pa.Table.from_pandas(
            g.rename(columns={"size": "n"}), preserve_index=False)

    g = (ds.map_batches(partial, batch_format="pyarrow")
         .to_pandas().groupby(["b", "t", "s"], as_index=False)["n"]
         .sum())
    rb = g.groupby("b")["n"].sum()
    rt = g.groupby("t")["n"].sum()
    rs = g.groupby("s")["n"].sum()
    big_n = int(g["n"].sum())
    n2 = big_n * big_n
    obs = {(b, t_, s): int(n)
           for b, t_, s, n in g.itertuples(index=False)}
    chi2 = 0
    for b in rb.index:
        for t_ in rt.index:
            for s in rs.index:
                e3 = int(rb[b]) * int(rt[t_]) * int(rs[s])
                o = obs.get((b, t_, s), 0)
                num = n2 * o - e3
                chi2 += 1000 * num * num // (n2 * e3)
    dof = (len(rb) * len(rt) * len(rs)
           - (len(rb) - 1) - (len(rt) - 1) - (len(rs) - 1) - 1)
    return pd.DataFrame(
        [(big_n, len(rb), len(rt), len(rs), len(obs), dof, chi2)],
        columns=["n_parts", "n_brands", "n_types", "n_sizes",
                 "n_cells_occupied", "df", "chi2_milli"]) \
        .astype("int64")


def user_error_exposure(sf_dir: str) -> pd.DataFrame:
    """ERROR exposure — how many users ever hit an error event, and
    of those, how many RAGE-QUIT (their very last event, under the
    total (ts, event_id) order, is an error)? Exposure and
    rage-quit shares in exact bps — the support-ticket-predictor
    pair of numbers. One ``user % 64`` exchange of per-block
    (user, saw-error, last-candidate) rows; buckets fold exposure
    flags and resolve the global last event per user. Pure
    integers."""
    ds = _read(sf_dir, "events",
               columns=["user_id", "ts", "event_id", "event_type"])

    def derive(t: pa.Table) -> pa.Table:
        u = t.column("user_id").to_numpy().astype(np.int64)
        ts = t.column("ts").cast(pa.int64()).to_numpy()
        e = t.column("event_id").to_numpy().astype(np.int64)
        err = (np.asarray(t.column("event_type").to_numpy(
            zero_copy_only=False)) == "error").astype(np.int64)
        order = np.lexsort((e, ts, u))
        us = u[order]
        last = np.zeros(len(us), dtype=bool)
        last[:-1] = us[1:] != us[:-1]
        last[-1] = True
        keep = order[last]
        uu, inv = np.unique(u, return_inverse=True)
        saw = np.zeros(len(uu), np.int64)
        np.maximum.at(saw, inv, err)
        return pa.table({"u": pa.array(uu), "saw": pa.array(saw),
                         "lts": pa.array(ts[keep]),
                         "le": pa.array(e[keep]),
                         "lerr": pa.array(err[keep]),
                         "bucket": pa.array((uu % 64)
                                            .astype(np.int32))})

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        uu, inv = np.unique(g["u"].to_numpy(np.int64),
                            return_inverse=True)
        saw = np.zeros(len(uu), np.int64)
        np.maximum.at(saw, inv, g["saw"].to_numpy(np.int64))
        order = np.lexsort((g["le"].to_numpy(np.int64),
                            g["lts"].to_numpy(np.int64),
                            g["u"].to_numpy(np.int64)))
        us = g["u"].to_numpy(np.int64)[order]
        last = np.zeros(len(us), dtype=bool)
        last[:-1] = us[1:] != us[:-1]
        last[-1] = True
        lerr = g["lerr"].to_numpy(np.int64)[order][last]
        return pd.DataFrame(
            [(len(uu), int(saw.sum()), int(lerr.sum()))],
            columns=["n_users", "n_saw", "n_rage"])

    g = (ds.map_batches(derive, batch_format="pyarrow")
         .groupby("bucket").map_groups(fold, batch_format="pandas")
         .to_pandas().sum())
    n = int(g["n_users"])
    saw = int(g["n_saw"])
    rage = int(g["n_rage"])
    return pd.DataFrame(
        [(n, saw, 10000 * saw // n, rage,
          10000 * rage // saw if saw > 0 else -9999)],
        columns=["n_users", "n_saw_error", "exposure_bps",
                 "n_rage_quit", "rage_quit_bps"]).astype("int64")


def customer_value_gap_interaction(sf_dir: str) -> pd.DataFrame:
    """VALUE × CADENCE — do high-lifetime-value customers reorder
    FASTER? Customers band by fixed lifetime-cents thresholds
    (<1.5M, <2.5M, <3.5M, >=3.5M dollars-in-cents·100), and each
    band reports its repeat-customer count, inter-order gap count,
    exact ceil-rank p50 gap and truncating milli mean gap in days
    (consecutive orders under the (day, orderkey) order; same-day
    gaps count as 0). Whales-order-often is the cross-sell
    assumption this either confirms or kills. One ``cust % 64``
    exchange of slim order rows; buckets fold per-customer value +
    sorted gaps into bounded (band, gap) cells. Pure integers."""
    ds = _read(sf_dir, "orders",
               columns=["o_custkey", "o_orderdate", "o_orderkey",
                        "o_totalprice"])

    def derive(t: pa.Table) -> pa.Table:
        c = t.column("o_custkey").to_numpy().astype(np.int64)
        return pa.table({
            "c": pa.array(c),
            "d": pa.array(t.column("o_orderdate").cast(pa.int64())
                          .to_numpy() // _DAY_US),
            "k": t.column("o_orderkey").cast(pa.int64()),
            "v": pa.array(np.floor(t.column("o_totalprice")
                                   .to_numpy() * 100)
                          .astype(np.int64)),
            "bucket": pa.array((c % 64).astype(np.int32))})

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        c = g["c"].to_numpy(np.int64)
        order = np.lexsort((g["k"].to_numpy(np.int64),
                            g["d"].to_numpy(np.int64), c))
        cs = c[order]
        d = g["d"].to_numpy(np.int64)[order]
        v = g["v"].to_numpy(np.int64)[order]
        uu, start = np.unique(cs, return_index=True)
        n = np.diff(np.append(start, len(cs)))
        cv = np.concatenate(([0], np.cumsum(v)))
        tv = cv[start + n] - cv[start]
        band = np.where(tv < 150_000_000, 0,
                        np.where(tv < 250_000_000, 1,
                                 np.where(tv < 350_000_000, 2, 3)))
        same = cs[1:] == cs[:-1]
        gap = d[1:] - d[:-1]
        cband = np.repeat(band, n)[1:]
        rep = np.zeros(4, np.int64)
        np.add.at(rep, band[n >= 2], 1)
        out = pd.DataFrame({"band": cband[same],
                            "gap": gap[same]}).groupby(
            ["band", "gap"], as_index=False).size() \
            .rename(columns={"size": "cc"})
        out["rep0"] = 0
        reprow = pd.DataFrame({"band": np.arange(4, dtype=np.int64),
                               "gap": -1, "cc": 0, "rep0": rep})
        return pd.concat([out, reprow], ignore_index=True)

    g = (ds.map_batches(derive, batch_format="pyarrow")
         .groupby("bucket").map_groups(fold, batch_format="pandas")
         .to_pandas()
         .groupby(["band", "gap"], as_index=False)[["cc", "rep0"]]
         .sum())
    rows = []
    for band in sorted(g["band"].unique()):
        sub = g[(g["band"] == band) & (g["gap"] >= 0)] \
            .sort_values("gap")
        nrep = int(g.loc[(g["band"] == band) & (g["gap"] == -1),
                         "rep0"].sum())
        ng = int(sub["cc"].sum())
        if ng == 0:
            continue
        s = int((sub["gap"].to_numpy(np.int64)
                 * sub["cc"].to_numpy(np.int64)).sum())
        cum = sub["cc"].cumsum().to_numpy(np.int64)
        rank = (50 * ng + 99) // 100
        p50 = int(sub["gap"].to_numpy(np.int64)[
            np.searchsorted(cum, rank)])
        rows.append((int(band), nrep, ng, p50, 1000 * s // ng))
    return pd.DataFrame(rows, columns=["value_band",
                                       "n_repeat_customers",
                                       "n_gaps", "p50_gap_days",
                                       "mean_gap_milli"]) \
        .astype("int64")


def events_daily_load_factor(sf_dir: str) -> pd.DataFrame:
    """DAILY load factor — per day, the peak hour's traffic
    multiple over the day's hourly average (1000·24·max_hour //
    day_total, milli units): the census p50 across days, the worst
    day's factor and its epoch day, plus day count. Capacity
    planned to the daily AVERAGE under-provisions by exactly this
    factor — the number an autoscaler's headroom comes from.
    Per-block bounded (day, hour) count partials — ZERO shuffle,
    pure integers."""
    ds = _read(sf_dir, "events", columns=["ts"])

    def partial(t: pa.Table) -> pa.Table:
        ts = t.column("ts").cast(pa.int64()).to_numpy()
        d = ts // _DAY_US
        h = (ts // 3_600_000_000) % 24
        key = d * 24 + h
        uk, cnt = np.unique(key, return_counts=True)
        return pa.table({"d": pa.array(uk // 24),
                         "h": pa.array(uk % 24),
                         "c": pa.array(cnt.astype(np.int64))})

    g = (ds.map_batches(partial, batch_format="pyarrow")
         .to_pandas().groupby(["d", "h"], as_index=False)["c"]
         .sum())
    days = g.groupby("d")["c"].agg(["sum", "max"])
    lf = (1000 * 24 * days["max"].to_numpy(np.int64)
          // days["sum"].to_numpy(np.int64))
    order = np.argsort(lf, kind="stable")
    n = len(lf)
    rank = (50 * n + 99) // 100
    p50 = int(lf[order][rank - 1])
    worst_i = int(np.argmax(lf))
    return pd.DataFrame(
        [(n, p50, int(lf.max()),
          int(days.index.to_numpy(np.int64)[worst_i]))],
        columns=["n_days", "p50_lf_milli", "max_lf_milli",
                 "max_day"]).astype("int64")


def type_brand_dominance(sf_dir: str) -> pd.DataFrame:
    """TYPE ownership — within each part type, which brand takes
    the most revenue, and how dominant is it? Per type: gross
    cents, active brand count, the top brand (ties resolve to the
    lexicographically smallest, = ORDER BY revenue DESC, brand
    LIMIT 1 per type in the twin) and its share in exact bps. A
    type owned >5000 bps by one brand prices like a monopoly
    segment. Part->(brand, type) LUT broadcast; per-block
    constant-cell revenue partials — ZERO row shuffle, pure
    integers."""
    import ray

    part = _read(sf_dir, "part",
                 columns=["p_partkey", "p_brand", "p_type"]) \
        .to_pandas()
    bcode, buniq = pd.factorize(part["p_brand"], sort=True)
    tcode, tuniq = pd.factorize(part["p_type"], sort=True)
    pk = part["p_partkey"].to_numpy(np.int64)
    nb, nt = len(buniq), len(tuniq)
    lut = np.zeros(pk.max() + 1, dtype=np.int64)
    lut[pk] = bcode * nt + tcode
    ref = ray.put(lut)

    ds = _read(sf_dir, "lineitem",
               columns=["l_partkey", "l_extendedprice"])

    def partial(t: pa.Table) -> pa.Table:
        lut_ = ray.get(ref)
        cell = lut_[t.column("l_partkey").to_numpy()
                    .astype(np.int64)]
        cents = np.floor(t.column("l_extendedprice").to_numpy()
                         * 100).astype(np.int64)
        s = np.zeros(nb * nt, np.int64)
        np.add.at(s, cell, cents)
        return pa.table({
            "cell": pa.array(np.arange(nb * nt, dtype=np.int64)),
            "s": pa.array(s)})

    g = (ds.map_batches(partial, batch_format="pyarrow")
         .to_pandas().groupby("cell")["s"].sum())
    grid = np.zeros(nb * nt, dtype=np.int64)
    grid[g.index.to_numpy()] = g.to_numpy()
    grid = grid.reshape(nb, nt)
    rows = []
    for t_ in range(nt):
        col = grid[:, t_]
        tot = int(col.sum())
        if tot == 0:
            continue
        top = int(np.argmax(col))
        rows.append((str(tuniq[t_]), tot, int((col > 0).sum()),
                     str(buniq[top]),
                     10000 * int(col[top]) // tot))
    out = pd.DataFrame(rows, columns=["p_type", "gross_cents",
                                      "n_brands", "top_brand",
                                      "top_share_bps"])
    out["gross_cents"] = out["gross_cents"].astype("int64")
    out["n_brands"] = out["n_brands"].astype("int64")
    out["top_share_bps"] = out["top_share_bps"].astype("int64")
    return out.sort_values("p_type").reset_index(drop=True)


def user_day_type_breadth(sf_dir: str) -> pd.DataFrame:
    """DAY-BREADTH census — on an active (user, day), how many
    DISTINCT event types fire? Breadth histogram with shares in
    exact bps: a breadth-1 product is a single-feature habit; deep
    breadth means sessions traverse the surface — the
    engagement-depth number behind "sticky" claims. One
    ``user % 64`` exchange of per-block distinct (user, day, type)
    rows; buckets fold distinct counts vectorized into bounded
    histograms. Pure integers."""
    ds = _read(sf_dir, "events",
               columns=["user_id", "ts", "event_type"])

    def derive(t: pa.Table) -> pa.Table:
        u = t.column("user_id").to_numpy().astype(np.int64)
        d = t.column("ts").cast(pa.int64()).to_numpy() // _DAY_US
        typ, tinv = np.unique(t.column("event_type").to_numpy(),
                              return_inverse=True)
        df = pd.DataFrame({"u": u, "d": d % 32768,
                           "typ": typ[tinv]}).drop_duplicates()
        df["bucket"] = (df["u"].to_numpy(np.int64) % 64) \
            .astype(np.int32)
        return pa.Table.from_pandas(df, preserve_index=False)

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates(["u", "d", "typ"])
        breadth = g.groupby(["u", "d"]).size().to_numpy()
        h = np.bincount(np.minimum(breadth, 8),
                        minlength=9).astype(np.int64)
        return pd.DataFrame({"breadth": np.arange(9,
                                                  dtype=np.int64),
                             "n_user_days": h})

    g = (ds.map_batches(derive, batch_format="pyarrow")
         .groupby("bucket").map_groups(fold, batch_format="pandas")
         .to_pandas().groupby("breadth", as_index=False).sum())
    tot = int(g["n_user_days"].sum())
    g = g[g["n_user_days"] > 0].sort_values("breadth") \
        .reset_index(drop=True)
    g["share_bps"] = 10000 * g["n_user_days"].to_numpy(np.int64) \
        // tot
    return g.astype("int64")


def catalog_vs_street_price(sf_dir: str) -> pd.DataFrame:
    """CATALOG vs STREET — per part type, the catalog's mean retail
    price against the mean realized unit price on actual lines
    (truncating ``cents // qty`` units), and the street-to-list
    ratio in milli (1000·street_mean // catalog_mean, both
    truncating cents means). A ratio well under 1000 is systematic
    discounting off list; over 1000 means the catalog lags the
    market. Part->(type) LUT broadcast; per-block constant-cell
    partials on both tables — ZERO row shuffle, pure integers."""
    import ray

    part = _read(sf_dir, "part",
                 columns=["p_partkey", "p_type",
                          "p_retailprice"]).to_pandas()
    tcode, tuniq = pd.factorize(part["p_type"], sort=True)
    nt = len(tuniq)
    pk = part["p_partkey"].to_numpy(np.int64)
    lut = np.zeros(pk.max() + 1, dtype=np.int64)
    lut[pk] = tcode
    ref = ray.put(lut)
    cat_cents = np.floor(part["p_retailprice"].to_numpy() * 100) \
        .astype(np.int64)
    cat_sum = np.zeros(nt, np.int64)
    np.add.at(cat_sum, tcode, cat_cents)
    cat_n = np.bincount(tcode, minlength=nt).astype(np.int64)

    ds = _read(sf_dir, "lineitem",
               columns=["l_partkey", "l_extendedprice",
                        "l_quantity"])

    def partial(t: pa.Table) -> pa.Table:
        lut_ = ray.get(ref)
        tc = lut_[t.column("l_partkey").to_numpy()
                  .astype(np.int64)]
        uc = (np.floor(t.column("l_extendedprice").to_numpy()
                       * 100).astype(np.int64)
              // np.floor(t.column("l_quantity").to_numpy())
              .astype(np.int64))
        s = np.zeros(nt, np.int64)
        np.add.at(s, tc, uc)
        n = np.bincount(tc, minlength=nt).astype(np.int64)
        return pa.table({"t": pa.array(np.arange(nt,
                                                 dtype=np.int64)),
                         "s": pa.array(s), "n": pa.array(n)})

    g = (ds.map_batches(partial, batch_format="pyarrow")
         .to_pandas().groupby("t")[["s", "n"]].sum())
    rows = []
    for t_ in range(nt):
        ln = int(g["n"].get(t_, 0))
        if ln == 0 or cat_n[t_] == 0:
            continue
        cat_mean = int(cat_sum[t_]) // int(cat_n[t_])
        street_mean = int(g["s"].get(t_)) // ln
        rows.append((str(tuniq[t_]), int(cat_n[t_]), cat_mean, ln,
                     street_mean,
                     1000 * street_mean // cat_mean))
    out = pd.DataFrame(rows, columns=["p_type", "n_parts",
                                      "catalog_mean_cents",
                                      "n_lines",
                                      "street_mean_cents",
                                      "street_to_list_milli"])
    for c in out.columns[1:]:
        out[c] = out[c].astype("int64")
    return out


def events_value_tail_share(sf_dir: str) -> pd.DataFrame:
    """TAIL concentration — what share of total event value rides
    in the top 1% of events? Exact ceil-rank p99 cents threshold
    from a bounded value histogram, then the count and value share
    (in exact bps) of events at or above it. If the tail carries
    half the value, mean-based dashboards and per-event sampling
    are both lying — the heavy-tail disclosure number. Per-block
    bounded (cents) histogram partials — ZERO shuffle, pure
    integers."""
    ds = _read(sf_dir, "events", columns=["value"])

    def partial(t: pa.Table) -> pa.Table:
        cents = np.floor(t.column("value").to_numpy() * 100) \
            .astype(np.int64)
        u, c = np.unique(cents, return_counts=True)
        return pa.table({"v": pa.array(u),
                         "c": pa.array(c.astype(np.int64))})

    g = (ds.map_batches(partial, batch_format="pyarrow")
         .to_pandas().groupby("v")["c"].sum().sort_index())
    v = g.index.to_numpy(np.int64)
    c = g.to_numpy(np.int64)
    n = int(c.sum())
    tot = int((v * c).sum())
    cum = np.cumsum(c)
    rank = (99 * n + 99) // 100
    p99 = int(v[np.searchsorted(cum, rank)])
    tail = v >= p99
    tail_n = int(c[tail].sum())
    tail_v = int((v[tail] * c[tail]).sum())
    return pd.DataFrame(
        [(n, tot, p99, tail_n, 10000 * tail_n // n,
          10000 * tail_v // tot if tot > 0 else -9999)],
        columns=["n_events", "total_cents", "p99_cents",
                 "n_tail", "tail_count_bps", "tail_value_bps"]) \
        .astype("int64")


def price_leadership_topk(sf_dir: str) -> pd.DataFrame:
    """PRICE LEADERSHIP — which suppliers set the floor? For every
    part, the supplier(s) whose minimum observed unit price
    (truncating ``cents // qty``) equals the part's global minimum
    earn one leadership credit (ties all credit — a shared floor is
    still a floor). Top 10 suppliers by credits, ties to the
    smaller key, with the credit rate over all parts in exact bps —
    the negotiate-with-these-first list. One ``part % 64`` exchange
    of per-block (part, supplier, min-unit) rollups; buckets fold
    floors vectorized and emit per-supplier credit partials plus
    one part-count marker row. Pure integers."""
    ds = _read(sf_dir, "lineitem",
               columns=["l_partkey", "l_suppkey", "l_extendedprice",
                        "l_quantity"])

    def derive(t: pa.Table) -> pa.Table:
        p = t.column("l_partkey").to_numpy().astype(np.int64)
        s = t.column("l_suppkey").to_numpy().astype(np.int64)
        uc = (np.floor(t.column("l_extendedprice").to_numpy() * 100)
              .astype(np.int64)
              // np.floor(t.column("l_quantity").to_numpy())
              .astype(np.int64))
        key = p * (1 << 32) + s
        uk, inv = np.unique(key, return_inverse=True)
        mn = np.full(len(uk), np.iinfo(np.int64).max, np.int64)
        np.minimum.at(mn, inv, uc)
        return pa.table({"p": pa.array(uk >> 32),
                         "s": pa.array(uk & ((1 << 32) - 1)),
                         "mn": pa.array(mn),
                         "bucket": pa.array(((uk >> 32) % 64)
                                            .astype(np.int32))})

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        key = g["p"].to_numpy(np.int64) * (1 << 32) \
            + g["s"].to_numpy(np.int64)
        uk, inv = np.unique(key, return_inverse=True)
        mn = np.full(len(uk), np.iinfo(np.int64).max, np.int64)
        np.minimum.at(mn, inv, g["mn"].to_numpy(np.int64))
        pu, pinv = np.unique(uk >> 32, return_inverse=True)
        pmin = np.full(len(pu), np.iinfo(np.int64).max, np.int64)
        np.minimum.at(pmin, pinv, mn)
        lead = mn == pmin[pinv]
        su = uk & ((1 << 32) - 1)
        cred = pd.DataFrame({"s": su[lead]}).groupby(
            "s", as_index=False).size().rename(
            columns={"size": "credits"})
        cred["parts_marker"] = 0
        marker = pd.DataFrame({"s": [-1], "credits": [0],
                               "parts_marker": [len(pu)]})
        return pd.concat([cred, marker], ignore_index=True)

    g = (ds.map_batches(derive, batch_format="pyarrow")
         .groupby("bucket").map_groups(fold, batch_format="pandas")
         .to_pandas())
    n_parts = int(g["parts_marker"].sum())
    cred = (g[g["s"] >= 0].groupby("s", as_index=False)["credits"]
            .sum())
    cred = cred.sort_values(["credits", "s"],
                            ascending=[False, True],
                            kind="mergesort").head(10)
    out = pd.DataFrame({
        "s_suppkey": cred["s"].to_numpy(np.int64),
        "n_lead_parts": cred["credits"].to_numpy(np.int64),
        "lead_rate_bps": 10000 * cred["credits"].to_numpy(np.int64)
        // n_parts}).reset_index(drop=True)
    return out.astype("int64")


def user_first_day_value_share(sf_dir: str) -> pd.DataFrame:
    """FIRST-DAY monetization — how much of a user's lifetime event
    value lands on their very first active day? Users with any
    value band by the cross-multiplied share test (zero-first-day,
    <25%, <50%, <75%, <100%, everything-day-one) with shares in
    exact bps — the onboarding-monetization shape: heavy
    everything-day-one mass means retention adds nothing to
    revenue. One ``user % 64`` exchange of per-block (user, day,
    cents) rollups; buckets fold first-day vs total sums
    vectorized. Pure integers."""
    ds = _read(sf_dir, "events", columns=["user_id", "ts", "value"])

    def derive(t: pa.Table) -> pa.Table:
        u = t.column("user_id").to_numpy().astype(np.int64)
        d = t.column("ts").cast(pa.int64()).to_numpy() // _DAY_US
        cents = np.floor(t.column("value").to_numpy() * 100) \
            .astype(np.int64)
        key = u * 32768 + (d % 32768)
        uk, inv = np.unique(key, return_inverse=True)
        s = np.zeros(len(uk), np.int64)
        np.add.at(s, inv, cents)
        return pa.table({"u": pa.array(uk // 32768),
                         "d": pa.array(uk % 32768),
                         "s": pa.array(s),
                         "bucket": pa.array(((uk // 32768) % 64)
                                            .astype(np.int32))})

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        key = g["u"].to_numpy(np.int64) * 32768 \
            + g["d"].to_numpy(np.int64)
        uk, inv = np.unique(key, return_inverse=True)
        s = np.zeros(len(uk), np.int64)
        np.add.at(s, inv, g["s"].to_numpy(np.int64))
        uu, uinv = np.unique(uk // 32768, return_inverse=True)
        tv = np.zeros(len(uu), np.int64)
        np.add.at(tv, uinv, s)
        dd = uk % 32768
        fd = np.full(len(uu), np.iinfo(np.int64).max, np.int64)
        np.minimum.at(fd, uinv, dd)
        fv = np.zeros(len(uu), np.int64)
        first_rows = dd == fd[uinv]
        np.add.at(fv, uinv[first_rows], s[first_rows])
        has = tv > 0
        fv, tv = fv[has], tv[has]
        band = np.where(fv == 0, 0,
                        np.where(100 * fv < 25 * tv, 1,
                                 np.where(100 * fv < 50 * tv, 2,
                                          np.where(100 * fv < 75
                                                   * tv, 3,
                                                   np.where(fv < tv,
                                                            4, 5)))))
        h = np.bincount(band, minlength=6).astype(np.int64)
        return pd.DataFrame({"band": np.arange(6, dtype=np.int64),
                             "n_users": h})

    g = (ds.map_batches(derive, batch_format="pyarrow")
         .groupby("bucket").map_groups(fold, batch_format="pandas")
         .to_pandas().groupby("band", as_index=False).sum())
    tot = int(g["n_users"].sum())
    g = g[g["n_users"] > 0].sort_values("band").reset_index(
        drop=True)
    g["share_bps"] = 10000 * g["n_users"].to_numpy(np.int64) // tot
    return g.astype("int64")


def order_discount_consistency(sf_dir: str) -> pd.DataFrame:
    """DISCOUNT consistency — inside one order, is the discount
    dial set once (order-level promo) or per line (line-level
    negotiation)? Orders band by distinct whole-percent discount
    levels across their lines (single-line orders separate, then
    uniform multi-line, 2 levels, 3+), with shares in exact bps.
    Uniform-heavy books can compress promo storage to one column —
    the schema-design datum. One ``order % 64`` exchange of
    per-block distinct (order, level) pairs with line counts;
    buckets fold distinct levels vectorized. Pure integers."""
    ds = _read(sf_dir, "lineitem",
               columns=["l_orderkey", "l_discount"])

    def derive(t: pa.Table) -> pa.Table:
        o = t.column("l_orderkey").to_numpy().astype(np.int64)
        dp = np.floor(t.column("l_discount").to_numpy() * 100) \
            .astype(np.int64)
        key = o * 16 + dp
        uk, cnt = np.unique(key, return_counts=True)
        return pa.table({"o": pa.array(uk // 16),
                         "dp": pa.array(uk % 16),
                         "k": pa.array(cnt.astype(np.int64)),
                         "bucket": pa.array(((uk // 16) % 64)
                                            .astype(np.int32))})

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        key = g["o"].to_numpy(np.int64) * 16 \
            + g["dp"].to_numpy(np.int64)
        uk, inv = np.unique(key, return_inverse=True)
        k = np.zeros(len(uk), np.int64)
        np.add.at(k, inv, g["k"].to_numpy(np.int64))
        ou, oinv = np.unique(uk // 16, return_inverse=True)
        nlev = np.bincount(oinv, minlength=len(ou)).astype(np.int64)
        nlines = np.zeros(len(ou), np.int64)
        np.add.at(nlines, oinv, k)
        band = np.where(nlines == 1, 0,
                        np.where(nlev == 1, 1,
                                 np.where(nlev == 2, 2, 3)))
        h = np.bincount(band, minlength=4).astype(np.int64)
        return pd.DataFrame({"band": np.arange(4, dtype=np.int64),
                             "n_orders": h})

    g = (ds.map_batches(derive, batch_format="pyarrow")
         .groupby("bucket").map_groups(fold, batch_format="pandas")
         .to_pandas().groupby("band", as_index=False).sum())
    tot = int(g["n_orders"].sum())
    g = g[g["n_orders"] > 0].sort_values("band").reset_index(
        drop=True)
    g["share_bps"] = 10000 * g["n_orders"].to_numpy(np.int64) // tot
    return g.astype("int64")


def embedding_dim_range(sf_dir: str) -> pd.DataFrame:
    """DIMENSION range calibration — per embedding dimension the
    exact fixed-point (floor(v·1e6)) min, max, span and absolute
    max: the numbers a symmetric-vs-asymmetric quantizer clips to.
    One dimension with 10× the span of the rest forces either a
    per-dim scale or a fat global range — this table decides which.
    Per-block 64-cell min/max partials over the stacked matrix —
    ZERO shuffle, pure integers."""
    ds = _read(sf_dir, "embeddings", columns=["embedding"],
               rows_per_block=4096)

    def partial(t: pa.Table) -> pa.Table:
        m = np.floor(np.stack(t.column("embedding").to_numpy(
            zero_copy_only=False)).astype(np.float64) * 1e6) \
            .astype(np.int64)
        return pa.table({"dim": pa.array(np.arange(1, m.shape[1] + 1,
                                                   dtype=np.int64)),
                         "mn": pa.array(m.min(axis=0)),
                         "mx": pa.array(m.max(axis=0))})

    g = (ds.map_batches(partial, batch_format="pyarrow")
         .to_pandas().groupby("dim")
         .agg(mn=("mn", "min"), mx=("mx", "max")).sort_index())
    mn = g["mn"].to_numpy(np.int64)
    mx = g["mx"].to_numpy(np.int64)
    return pd.DataFrame({
        "dim": g.index.to_numpy(np.int64),
        "min_fp": mn, "max_fp": mx, "span_fp": mx - mn,
        "absmax_fp": np.maximum(np.abs(mn), np.abs(mx))}).astype(
        "int64")


def part_name_pair_affinity(sf_dir: str) -> pd.DataFrame:
    """NAME-PAIR affinity — in two-word part names, does the
    adjective actually predict the noun? Top 10 (first-word,
    second-word) pairs by cross-multiplied lift
    1000·o·N // (r·c) with support ≥ 5, ties by lift DESC then
    pair; a strong affinity means names encode a hidden taxonomy a
    splitter-based feature would miss. Vocabulary-sized per-block
    pair-count partials — ZERO shuffle, pure integers."""
    ds = _read(sf_dir, "part", columns=["p_name"])

    def partial(t: pa.Table) -> pa.Table:
        s = pd.Series(t.column("p_name").to_pylist())
        w = s.str.split(" ", n=1, expand=True)
        g = pd.DataFrame({"w1": w[0], "w2": w[1]}).groupby(
            ["w1", "w2"], as_index=False).size()
        return pa.Table.from_pandas(
            g.rename(columns={"size": "n"}), preserve_index=False)

    g = (ds.map_batches(partial, batch_format="pyarrow")
         .to_pandas().groupby(["w1", "w2"], as_index=False)["n"]
         .sum())
    n_tot = int(g["n"].sum())
    rn = g.groupby("w1")["n"].sum()
    cn = g.groupby("w2")["n"].sum()
    g = g[g["n"] >= 5].copy()
    n = g["n"].to_numpy(np.int64)
    r = rn.loc[g["w1"]].to_numpy(np.int64)
    c = cn.loc[g["w2"]].to_numpy(np.int64)
    g["lift_milli"] = 1000 * n * n_tot // (r * c)
    g = g.sort_values(["lift_milli", "w1", "w2"],
                      ascending=[False, True, True],
                      kind="mergesort").head(10)
    return pd.DataFrame({
        "w1": g["w1"].to_numpy(), "w2": g["w2"].to_numpy(),
        "n_parts": g["n"].to_numpy(np.int64),
        "lift_milli": g["lift_milli"].to_numpy(np.int64)}).astype(
        {"n_parts": "int64", "lift_milli": "int64"})


def events_value_mode_census(sf_dir: str) -> pd.DataFrame:
    """VALUE-MODE census — the 10 most frequent EXACT cent values
    in the event stream, with counts and shares in bps (ties by
    count DESC then value ASC). Spikes at arbitrary constants are
    sentinel values or hard-coded instrumentation defaults — the
    cousin of round-number bias that catches 9.99 and 123.45, not
    just .00. Per-block bounded value-histogram partials — ZERO
    shuffle, pure integers."""
    ds = _read(sf_dir, "events", columns=["value"])

    def partial(t: pa.Table) -> pa.Table:
        u, c = np.unique(np.floor(t.column("value").to_numpy()
                                  * 100).astype(np.int64),
                         return_counts=True)
        return pa.table({"v": pa.array(u),
                         "c": pa.array(c.astype(np.int64))})

    g = (ds.map_batches(partial, batch_format="pyarrow")
         .to_pandas().groupby("v", as_index=False)["c"].sum())
    tot = int(g["c"].sum())
    g = g.sort_values(["c", "v"], ascending=[False, True],
                      kind="mergesort").head(10)
    return pd.DataFrame({
        "value_cents": g["v"].to_numpy(np.int64),
        "n_events": g["c"].to_numpy(np.int64),
        "share_bps": 10000 * g["c"].to_numpy(np.int64)
        // tot}).astype("int64")


def weekend_priority_shift(sf_dir: str) -> pd.DataFrame:
    """WEEKEND urgency — does the priority mix shift when orders
    land on a weekend? Per priority digit: weekday and weekend
    order counts, the weekend share in exact bps, and the lift of
    each priority's weekend share vs the overall weekend rate
    cross-multiplied. A positive urgent-lift means the
    expedite-queue staffing can't be weekday-only. Per-block
    10-cell partials under the (epoch_day+4)%7 convention — ZERO
    shuffle, pure integers."""
    ds = _read(sf_dir, "orders",
               columns=["o_orderdate", "o_orderpriority"])

    def partial(t: pa.Table) -> pa.Table:
        d = t.column("o_orderdate").cast(pa.int64()).to_numpy() \
            // _DAY_US
        wk = (d + 4) % 7
        we = ((wk == 0) | (wk == 6)).astype(np.int64)
        p = pc.utf8_slice_codeunits(t.column("o_orderpriority"),
                                    0, 1).cast(pa.int64()).to_numpy()
        cell = p * 2 + we
        c = np.bincount(cell, minlength=12).astype(np.int64)
        return pa.table({"cell": pa.array(np.arange(12,
                                                    dtype=np.int64)),
                         "c": pa.array(c)})

    g = (ds.map_batches(partial, batch_format="pyarrow")
         .to_pandas().groupby("cell")["c"].sum())
    grid = np.zeros(12, dtype=np.int64)
    grid[g.index.to_numpy()] = g.to_numpy()
    grid = grid.reshape(6, 2)
    n_tot = int(grid.sum())
    we_tot = int(grid[:, 1].sum())
    rows = []
    for p in range(6):
        n = int(grid[p].sum())
        if n == 0:
            continue
        we = int(grid[p, 1])
        rows.append((p, n - we, we, 10000 * we // n,
                     1000 * we * n_tot // (n * we_tot) - 1000
                     if we_tot > 0 else -9999))
    return pd.DataFrame(rows, columns=["priority", "n_weekday",
                                       "n_weekend", "weekend_bps",
                                       "lift_milli"]).astype(
        "int64")


def user_activity_fingerprint_dups(sf_dir: str) -> pd.DataFrame:
    """ACTIVITY-FINGERPRINT duplicates — how many users share an
    IDENTICAL set of active days? Each user's fingerprint is the
    comma-joined ascending active-day list; exact-duplicate
    fingerprints across users are bot rings, replayed accounts, or
    duplicated instrumentation (organic humans virtually never tie
    on 10+ specific days). Reports users, distinct patterns, users
    inside duplicate groups with share in bps, and the largest
    group. One ``user % 64`` exchange of distinct (user, day) rows;
    buckets build fingerprints vectorized and emit pattern-count
    partials (the duplicate census merges exactly on the driver
    because identical day SETS hash to identical strings). Pure
    integers."""
    ds = _read(sf_dir, "events", columns=["user_id", "ts"])

    def derive(t: pa.Table) -> pa.Table:
        u = t.column("user_id").to_numpy().astype(np.int64)
        d = t.column("ts").cast(pa.int64()).to_numpy() // _DAY_US
        key = u * 32768 + (d % 32768)
        uk = np.unique(key)
        return pa.table({"u": pa.array(uk // 32768),
                         "d": pa.array(uk % 32768),
                         "bucket": pa.array(((uk // 32768) % 64)
                                            .astype(np.int32))})

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates(["u", "d"]).sort_values(["u", "d"])
        fp = g.groupby("u")["d"].agg(
            lambda s: ",".join(map(str, s)))
        out = fp.to_frame("fp").groupby("fp", as_index=False).size()
        return out.rename(columns={"size": "n"})

    g = (ds.map_batches(derive, batch_format="pyarrow")
         .groupby("bucket").map_groups(fold, batch_format="pandas")
         .to_pandas().groupby("fp", as_index=False)["n"].sum())
    n_users = int(g["n"].sum())
    n_patterns = len(g)
    dup = g[g["n"] >= 2]
    n_dup_users = int(dup["n"].sum())
    max_group = int(g["n"].max())
    return pd.DataFrame(
        [(n_users, n_patterns, n_dup_users,
          10000 * n_dup_users // n_users, max_group)],
        columns=["n_users", "n_patterns", "n_users_in_dup_groups",
                 "dup_share_bps", "max_group"]).astype("int64")


def nation_part_coverage(sf_dir: str) -> pd.DataFrame:
    """ASSORTMENT breadth by nation — how much of the part universe
    does each supplier nation actually ship? Per nation: distinct
    parts touched, coverage of the full catalog in exact bps, and
    line count. A nation with deep lines but narrow coverage is a
    specialist; sourcing diversification needs the breadth number,
    not the volume one. Supplier->nation LUT broadcast; one
    ``(nation, part) % 64`` exchange of per-block distinct pairs;
    buckets count distinct parts per nation. Pure integers."""
    import ray

    supp = _read(sf_dir, "supplier",
                 columns=["s_suppkey", "s_nationkey"]).to_pandas()
    sk = supp["s_suppkey"].to_numpy(np.int64)
    lut = np.zeros(sk.max() + 1, dtype=np.int64)
    lut[sk] = supp["s_nationkey"].to_numpy(np.int64)
    ref = ray.put(lut)
    n_parts_all = int(_read(sf_dir, "part", columns=["p_partkey"])
                      .count())

    ds = _read(sf_dir, "lineitem",
               columns=["l_suppkey", "l_partkey"])

    def derive(t: pa.Table) -> pa.Table:
        lut_ = ray.get(ref)
        nk = lut_[t.column("l_suppkey").to_numpy()
                  .astype(np.int64)]
        p = t.column("l_partkey").to_numpy().astype(np.int64)
        key = nk * (1 << 32) + p
        uk, cnt = np.unique(key, return_counts=True)
        return pa.table({"k": pa.array(uk >> 32),
                         "p": pa.array(uk & ((1 << 32) - 1)),
                         "c": pa.array(cnt.astype(np.int64)),
                         "bucket": pa.array((uk % 64)
                                            .astype(np.int32))})

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        key = g["k"].to_numpy(np.int64) * (1 << 32) \
            + g["p"].to_numpy(np.int64)
        uk, inv = np.unique(key, return_inverse=True)
        c = np.zeros(len(uk), np.int64)
        np.add.at(c, inv, g["c"].to_numpy(np.int64))
        nu, ninv = np.unique(uk >> 32, return_inverse=True)
        np_ = np.bincount(ninv, minlength=len(nu)).astype(np.int64)
        nl = np.zeros(len(nu), np.int64)
        np.add.at(nl, ninv, c)
        return pd.DataFrame({"k": nu, "n_parts": np_,
                             "n_lines": nl})

    g = (ds.map_batches(derive, batch_format="pyarrow")
         .groupby("bucket").map_groups(fold, batch_format="pandas")
         .to_pandas().groupby("k", as_index=False)[["n_parts",
                                                    "n_lines"]]
         .sum())
    nat = _read(sf_dir, "nation",
                columns=["n_nationkey", "n_name"]).to_pandas()
    names = dict(zip(nat["n_nationkey"].astype(int), nat["n_name"]))
    g["nation"] = g["k"].map(names)
    g = g.sort_values("nation").reset_index(drop=True)
    return pd.DataFrame({
        "nation": g["nation"],
        "n_parts_touched": g["n_parts"].astype("int64"),
        "coverage_bps": (10000 * g["n_parts"].to_numpy(np.int64)
                         // n_parts_all),
        "n_lines": g["n_lines"].astype("int64")}).astype(
        {"n_parts_touched": "int64", "coverage_bps": "int64",
         "n_lines": "int64"})


def basket_width_trend(sf_dir: str) -> pd.DataFrame:
    """BASKET-WIDTH trend — are orders getting wider or narrower
    over the years? Per order year: order count, line count, and
    the exact truncating milli mean lines per order. A narrowing
    basket with flat order counts is revenue decline hiding behind
    a healthy-looking order dashboard. Scale shape is the
    tagged-union ``order % 64`` hash join (orders ship (key, year),
    lineitem ships (key, 1) counts). Pure integers."""
    li = (_read(sf_dir, "lineitem", columns=["l_orderkey"])
          .map_batches(lambda t: (lambda u, c: pa.table({
              "k": pa.array(u), "y": pa.array(np.full(len(u), -1,
                                                      np.int64)),
              "c": pa.array(c.astype(np.int64)),
              "bucket": pa.array((u % 64).astype(np.int32))}))(
              *np.unique(t.column("l_orderkey").to_numpy()
                         .astype(np.int64), return_counts=True)),
              batch_format="pyarrow"))
    od = (_read(sf_dir, "orders",
                columns=["o_orderkey", "o_orderdate"])
          .map_batches(lambda t: pa.table({
              "k": t.column("o_orderkey").cast(pa.int64()),
              "y": pa.array(t.column("o_orderdate").cast(pa.int64())
                            .to_numpy() // _DAY_US // 365),
              "c": pa.array(np.zeros(len(t), np.int64)),
              "bucket": pc.cast(pc.bit_wise_and(
                  t.column("o_orderkey").cast(pa.int64()), 63),
                  pa.int32())}), batch_format="pyarrow"))

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        o = g[g["y"] >= 0][["k", "y"]]
        l_ = g[g["y"] < 0].groupby("k", as_index=False)["c"].sum()
        m = o.merge(l_, on="k")
        out = m.groupby("y", as_index=False).agg(
            n_orders=("c", "size"), n_lines=("c", "sum"))
        return out

    g = (li.union(od).groupby("bucket")
         .map_groups(fold, batch_format="pandas")
         .to_pandas().groupby("y", as_index=False)[["n_orders",
                                                    "n_lines"]]
         .sum().sort_values("y").reset_index(drop=True))
    return pd.DataFrame({
        "year_id": g["y"].astype("int64"),
        "n_orders": g["n_orders"].astype("int64"),
        "n_lines": g["n_lines"].astype("int64"),
        "mean_lines_milli": (1000 * g["n_lines"].to_numpy(np.int64)
                             // g["n_orders"].to_numpy(np.int64))
    }).astype("int64")


def premium_return_interaction(sf_dir: str) -> pd.DataFrame:
    """PREMIUM × RETURNS — are lines priced above the part's own
    mean returned more often? Every line scores its relative price
    10000·uc·n_p // sum_p (pass A folds the part table exactly as
    ``nation_price_premium``), bands by fixed thresholds (<9800,
    <10000, <10200, ≥10200), and each band reports line count,
    returned share in exact bps and the lift vs the global return
    rate. A rising curve is the market punishing premium pricing —
    the returns-as-price-signal read. Two broadcast passes, ZERO
    row shuffle, pure integers."""
    import ray

    ds = _read(sf_dir, "lineitem",
               columns=["l_partkey", "l_extendedprice", "l_quantity",
                        "l_returnflag"])

    def partialA(t: pa.Table) -> pa.Table:
        p = t.column("l_partkey").to_numpy().astype(np.int64)
        uc = (np.floor(t.column("l_extendedprice").to_numpy() * 100)
              .astype(np.int64)
              // np.floor(t.column("l_quantity").to_numpy())
              .astype(np.int64))
        pu, inv = np.unique(p, return_inverse=True)
        s = np.zeros(len(pu), np.int64)
        np.add.at(s, inv, uc)
        c = np.bincount(inv, minlength=len(pu)).astype(np.int64)
        return pa.table({"p": pa.array(pu), "s": pa.array(s),
                         "c": pa.array(c)})

    pg = (ds.map_batches(partialA, batch_format="pyarrow")
          .to_pandas().groupby("p")[["s", "c"]].sum())
    pmax = int(pg.index.max())
    psum = np.zeros(pmax + 1, np.int64)
    psum[pg.index.to_numpy()] = pg["s"].to_numpy(np.int64)
    pcnt = np.zeros(pmax + 1, np.int64)
    pcnt[pg.index.to_numpy()] = pg["c"].to_numpy(np.int64)
    refs = ray.put((psum, pcnt))

    def partialB(t: pa.Table) -> pa.Table:
        psum_, pcnt_ = ray.get(refs)
        p = t.column("l_partkey").to_numpy().astype(np.int64)
        uc = (np.floor(t.column("l_extendedprice").to_numpy() * 100)
              .astype(np.int64)
              // np.floor(t.column("l_quantity").to_numpy())
              .astype(np.int64))
        rel = 10000 * uc * pcnt_[p] // psum_[p]
        band = np.where(rel < 9800, 0,
                        np.where(rel < 10000, 1,
                                 np.where(rel < 10200, 2, 3)))
        r = (np.asarray(t.column("l_returnflag").to_numpy(
            zero_copy_only=False)) == "R").astype(np.int64)
        cell = band * 2 + r
        c = np.bincount(cell, minlength=8).astype(np.int64)
        return pa.table({"cell": pa.array(np.arange(8,
                                                    dtype=np.int64)),
                         "c": pa.array(c)})

    g = (ds.map_batches(partialB, batch_format="pyarrow")
         .to_pandas().groupby("cell")["c"].sum())
    grid = np.zeros(8, dtype=np.int64)
    grid[g.index.to_numpy()] = g.to_numpy()
    grid = grid.reshape(4, 2)
    n_tot = int(grid.sum())
    r_tot = int(grid[:, 1].sum())
    rows = []
    for b in range(4):
        n = int(grid[b].sum())
        if n == 0:
            continue
        r = int(grid[b, 1])
        rows.append((b, n, r, 10000 * r // n,
                     1000 * r * n_tot // (n * r_tot) - 1000
                     if r_tot > 0 else -9999))
    return pd.DataFrame(rows, columns=["rel_band", "n_lines",
                                       "n_returned", "return_bps",
                                       "lift_milli"]).astype(
        "int64")


def basket_width_ship_span(sf_dir: str) -> pd.DataFrame:
    """WIDTH × SPAN — do wider orders straggle across more shipping
    days? Per line-count band (1..6, 7+): order count, the exact
    truncating milli mean of the first-to-last ship-day span, and
    the same-day-complete share in exact bps. If span grows faster
    than width, fulfilment serializes — the consolidate-or-split
    shipping policy datum. One ``order % 64`` exchange of per-block
    (order, lines, min/max day) partials. Pure integers."""
    ds = _read(sf_dir, "lineitem",
               columns=["l_orderkey", "l_shipdate"])

    def derive(t: pa.Table) -> pa.Table:
        o = t.column("l_orderkey").to_numpy().astype(np.int64)
        d = t.column("l_shipdate").cast(pa.int64()).to_numpy() \
            // _DAY_US
        ou, inv = np.unique(o, return_inverse=True)
        n = np.bincount(inv, minlength=len(ou)).astype(np.int64)
        mn = np.full(len(ou), np.iinfo(np.int64).max, np.int64)
        np.minimum.at(mn, inv, d)
        mx = np.zeros(len(ou), np.int64)
        np.maximum.at(mx, inv, d)
        return pa.table({"o": pa.array(ou), "n": pa.array(n),
                         "mn": pa.array(mn), "mx": pa.array(mx),
                         "bucket": pa.array((ou % 64)
                                            .astype(np.int32))})

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        ou, inv = np.unique(g["o"].to_numpy(np.int64),
                            return_inverse=True)
        n = np.zeros(len(ou), np.int64)
        np.add.at(n, inv, g["n"].to_numpy(np.int64))
        mn = np.full(len(ou), np.iinfo(np.int64).max, np.int64)
        np.minimum.at(mn, inv, g["mn"].to_numpy(np.int64))
        mx = np.zeros(len(ou), np.int64)
        np.maximum.at(mx, inv, g["mx"].to_numpy(np.int64))
        band = np.minimum(n, 7) - 1
        span = mx - mn
        no = np.bincount(band, minlength=7).astype(np.int64)
        ss = np.zeros(7, np.int64)
        np.add.at(ss, band, span)
        sd = np.zeros(7, np.int64)
        np.add.at(sd, band, (span == 0).astype(np.int64))
        return pd.DataFrame({"band": np.arange(7, dtype=np.int64),
                             "n_orders": no, "sum_span": ss,
                             "n_same_day": sd})

    g = (ds.map_batches(derive, batch_format="pyarrow")
         .groupby("bucket").map_groups(fold, batch_format="pandas")
         .to_pandas().groupby("band", as_index=False).sum())
    g = g[g["n_orders"] > 0].sort_values("band").reset_index(
        drop=True)
    return pd.DataFrame({
        "line_band": g["band"].to_numpy(np.int64) + 1,
        "n_orders": g["n_orders"].to_numpy(np.int64),
        "mean_span_milli": (1000 * g["sum_span"].to_numpy(np.int64)
                            // g["n_orders"].to_numpy(np.int64)),
        "same_day_bps": (10000 * g["n_same_day"].to_numpy(np.int64)
                         // g["n_orders"].to_numpy(np.int64))
    }).astype("int64")


def returns_by_ship_dow(sf_dir: str) -> pd.DataFrame:
    """RETURNS by ship weekday — do lines shipped on certain days
    come back more? Per ship day-of-week ((epoch_day+4)%7,
    0=Sunday): line count, returned share in exact bps and the lift
    vs the global return rate — a weekend-ship return spike is a
    carrier-handoff or warehouse-staffing defect, not a product
    one. Per-block 14-cell partials — ZERO shuffle, pure
    integers."""
    ds = _read(sf_dir, "lineitem",
               columns=["l_shipdate", "l_returnflag"])

    def partial(t: pa.Table) -> pa.Table:
        d = t.column("l_shipdate").cast(pa.int64()).to_numpy() \
            // _DAY_US
        w = (d + 4) % 7
        r = (np.asarray(t.column("l_returnflag").to_numpy(
            zero_copy_only=False)) == "R").astype(np.int64)
        cell = w * 2 + r
        c = np.bincount(cell, minlength=14).astype(np.int64)
        return pa.table({"cell": pa.array(np.arange(14,
                                                    dtype=np.int64)),
                         "c": pa.array(c)})

    g = (ds.map_batches(partial, batch_format="pyarrow")
         .to_pandas().groupby("cell")["c"].sum())
    grid = np.zeros(14, dtype=np.int64)
    grid[g.index.to_numpy()] = g.to_numpy()
    grid = grid.reshape(7, 2)
    n_tot = int(grid.sum())
    r_tot = int(grid[:, 1].sum())
    rows = []
    for w in range(7):
        n = int(grid[w].sum())
        if n == 0:
            continue
        r = int(grid[w, 1])
        rows.append((w, n, r, 10000 * r // n,
                     1000 * r * n_tot // (n * r_tot) - 1000
                     if r_tot > 0 else -9999))
    return pd.DataFrame(rows, columns=["dow", "n_lines",
                                       "n_returned", "return_bps",
                                       "lift_milli"]).astype(
        "int64")


def unit_price_by_quantity(sf_dir: str) -> pd.DataFrame:
    """UNIT PRICE by quantity — is the per-unit price flat across
    order quantities, or does buying more cost less per unit? Per
    quantity 1..50: line count, the exact truncating mean unit
    price in cents (``cents // qty`` units) and its milli lift vs
    the global mean unit price. A flat curve means quantity carries
    no pricing power beyond the discount column — the
    don't-double-count-volume-discounts modeling check. Per-block
    100-cell sum partials — ZERO shuffle, pure integers."""
    ds = _read(sf_dir, "lineitem",
               columns=["l_quantity", "l_extendedprice"])

    def partial(t: pa.Table) -> pa.Table:
        q = np.floor(t.column("l_quantity").to_numpy()) \
            .astype(np.int64)
        uc = (np.floor(t.column("l_extendedprice").to_numpy() * 100)
              .astype(np.int64) // q)
        qc = np.clip(q, 1, 50)
        n = np.bincount(qc, minlength=51).astype(np.int64)
        s = np.zeros(51, np.int64)
        np.add.at(s, qc, uc)
        return pa.table({"q": pa.array(np.arange(51,
                                                 dtype=np.int64)),
                         "n": pa.array(n), "s": pa.array(s)})

    g = (ds.map_batches(partial, batch_format="pyarrow")
         .to_pandas().groupby("q")[["n", "s"]].sum())
    n_tot = int(g["n"].sum())
    s_tot = int(g["s"].sum())
    gmean = s_tot // n_tot
    rows = []
    for q in range(1, 51):
        n = int(g["n"].get(q, 0))
        if n == 0:
            continue
        mean = int(g["s"].get(q)) // n
        rows.append((q, n, mean, 1000 * mean // gmean - 1000))
    return pd.DataFrame(rows, columns=["quantity", "n_lines",
                                       "mean_unit_cents",
                                       "lift_milli"]).astype(
        "int64")


def source_token_budget(sf_dir: str) -> pd.DataFrame:
    """TOKEN BUDGET by source — the pretraining-mix table: per
    document source, docs, whitespace tokens (spaces + 1 per doc,
    exactly LENGTH − LENGTH(REPLACE(text,' ','')) + 1 in the twin),
    the corpus token share in exact bps and the truncating milli
    mean tokens per doc. Sampling weights and dedup budgets both
    start from this table, not from doc counts — docs and tokens
    disagree whenever sources have different document lengths.
    Vectorized per-block count_substring partials — ZERO shuffle,
    pure integers."""
    ds = _read(sf_dir, "documents", columns=["source", "text"])

    def partial(t: pa.Table) -> pa.Table:
        spaces = pc.count_substring(t.column("text"), " ") \
            .to_numpy().astype(np.int64)
        df = pd.DataFrame({"source": t.column("source").to_pylist(),
                           "tok": spaces + 1})
        g = df.groupby("source", as_index=False).agg(
            n_docs=("tok", "size"), n_tokens=("tok", "sum"))
        return pa.Table.from_pandas(g, preserve_index=False)

    g = (ds.map_batches(partial, batch_format="pyarrow")
         .to_pandas().groupby("source", as_index=False)[["n_docs",
                                                         "n_tokens"]]
         .sum().sort_values("source").reset_index(drop=True))
    tot = int(g["n_tokens"].sum())
    return pd.DataFrame({
        "source": g["source"],
        "n_docs": g["n_docs"].astype("int64"),
        "n_tokens": g["n_tokens"].astype("int64"),
        "token_share_bps": (10000 * g["n_tokens"].to_numpy(np.int64)
                            // tot),
        "mean_tokens_milli": (1000 * g["n_tokens"]
                              .to_numpy(np.int64)
                              // g["n_docs"].to_numpy(np.int64))
    }).astype({"n_docs": "int64", "n_tokens": "int64",
               "token_share_bps": "int64",
               "mean_tokens_milli": "int64"})


def type_arpu(sf_dir: str) -> pd.DataFrame:
    """ARPU by event type — value per DISTINCT user, not per event:
    per type the event count, distinct users, total cents and the
    truncating per-user cents. A type with huge per-event value but
    tiny reach monetizes differently from a broad cheap one — the
    reach-vs-depth monetization split. One ``(type, user)``
    distinct exchange (map-side np.unique partials) plus
    constant-cell value sums. Pure integers."""
    ds = _read(sf_dir, "events",
               columns=["event_type", "user_id", "value"])

    def derive(t: pa.Table) -> pa.Table:
        typ, tinv = np.unique(t.column("event_type").to_numpy(),
                              return_inverse=True)
        u = t.column("user_id").to_numpy().astype(np.int64)
        cents = np.floor(t.column("value").to_numpy() * 100) \
            .astype(np.int64)
        key = tinv.astype(np.int64) * (1 << 40) + u
        uk = np.unique(key)
        pairs = pd.DataFrame({"typ": typ[(uk >> 40)],
                              "u": uk & ((1 << 40) - 1)})
        agg = pd.DataFrame({"typ": typ[tinv], "n": 1,
                            "cents": cents}).groupby(
            "typ", as_index=False).agg(n=("n", "sum"),
                                       cents=("cents", "sum"))
        pairs["bucket"] = (pairs["u"].to_numpy(np.int64) % 64) \
            .astype(np.int32)
        pairs["n"] = 0
        pairs["cents"] = 0
        agg["u"] = -1
        agg["bucket"] = np.int32(-1)
        out = pd.concat([pairs, agg[["typ", "u", "bucket", "n",
                                     "cents"]]], ignore_index=True)
        return pa.Table.from_pandas(out, preserve_index=False)

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        users = g[g["u"] >= 0].drop_duplicates(["typ", "u"]) \
            .groupby("typ", as_index=False).size() \
            .rename(columns={"size": "n_users"})
        sums = g[g["u"] < 0].groupby("typ", as_index=False)[
            ["n", "cents"]].sum()
        return users.merge(sums, on="typ", how="outer").fillna(0)

    g = (ds.map_batches(derive, batch_format="pyarrow")
         .groupby("bucket").map_groups(fold, batch_format="pandas")
         .to_pandas().groupby("typ", as_index=False)
         .agg(n_users=("n_users", "sum"), n=("n", "sum"),
              cents=("cents", "sum"))
         .sort_values("typ").reset_index(drop=True))
    return pd.DataFrame({
        "event_type": g["typ"],
        "n_events": g["n"].astype("int64"),
        "n_users": g["n_users"].astype("int64"),
        "total_cents": g["cents"].astype("int64"),
        "arpu_cents": (g["cents"].to_numpy(np.int64)
                       // g["n_users"].to_numpy(np.int64))
    }).astype({"n_events": "int64", "n_users": "int64",
               "total_cents": "int64", "arpu_cents": "int64"})


def dead_stock_census(sf_dir: str) -> pd.DataFrame:
    """DEAD-STOCK census — catalog parts that never appear on a
    single line, by brand: never-sold count, share in exact bps,
    and the lift vs the global dead rate. A brand with triple the
    dead rate is an assortment-planning miss (or a feed that lists
    items the warehouse never had) — the catalog-vs-reality
    anti-join. Per-block distinct-part partials fold on the driver
    (parts are dimension-sized); ZERO row shuffle. Pure
    integers."""
    def partial(t: pa.Table) -> pa.Table:
        return pa.table({"p": pa.array(np.unique(
            t.column("l_partkey").to_numpy().astype(np.int64)))})

    sold = (_read(sf_dir, "lineitem", columns=["l_partkey"])
            .map_batches(partial, batch_format="pyarrow")
            .to_pandas()["p"].unique())
    sold_set = set(sold.tolist())
    part = _read(sf_dir, "part",
                 columns=["p_partkey", "p_brand"]).to_pandas()
    dead = ~part["p_partkey"].isin(sold_set)
    tot_parts = len(part)
    tot_dead = int(dead.sum())
    rows = []
    for b in sorted(part["p_brand"].unique()):
        m = (part["p_brand"] == b).to_numpy()
        n = int(m.sum())
        d = int((dead.to_numpy() & m).sum())
        lift = (1000 * d * tot_parts // (n * tot_dead) - 1000
                if tot_dead > 0 else -9999)
        rows.append((b, n, d, 10000 * d // n, lift))
    out = pd.DataFrame(rows, columns=["brand", "n_parts",
                                      "n_never_sold", "dead_bps",
                                      "lift_milli"])
    for c in out.columns[1:]:
        out[c] = out[c].astype("int64")
    return out


def user_resurrection_census(sf_dir: str) -> pd.DataFrame:
    """RESURRECTION census — users who went dormant (a gap of 28+
    days between consecutive ACTIVE days) and came back, which they
    did by construction of the gap: multi-day user count, users
    with at least one dormancy with share in exact bps, total
    dormancy episodes, the truncating milli mean dormancy length,
    and the longest. Win-back campaigns and churn labels both
    depend on whether dormancy-then-return actually happens
    organically. One ``user % 64`` exchange of distinct (user, day)
    rows; buckets diff sorted days per user vectorized. Pure
    integers."""
    ds = _read(sf_dir, "events", columns=["user_id", "ts"])

    def derive(t: pa.Table) -> pa.Table:
        u = t.column("user_id").to_numpy().astype(np.int64)
        d = t.column("ts").cast(pa.int64()).to_numpy() // _DAY_US
        key = u * 32768 + (d % 32768)
        uk = np.unique(key)
        return pa.table({"u": pa.array(uk // 32768),
                         "d": pa.array(uk % 32768),
                         "bucket": pa.array(((uk // 32768) % 64)
                                            .astype(np.int32))})

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        key = np.unique(g["u"].to_numpy(np.int64) * 32768
                        + g["d"].to_numpy(np.int64))
        u = key // 32768
        d = key % 32768
        same = u[1:] == u[:-1]
        gap = (d[1:] - d[:-1])[same]
        uu_pairs = u[1:][same]
        dorm = gap >= 28
        users_multi = np.unique(uu_pairs)
        dorm_users = np.unique(uu_pairs[dorm])
        return pd.DataFrame(
            [(len(users_multi), len(dorm_users), int(dorm.sum()),
              int(gap[dorm].sum()),
              int(gap[dorm].max()) if dorm.any() else 0)],
            columns=["n_multi", "n_dorm_users", "n_episodes",
                     "sum_dorm", "max_dorm"])

    g = (ds.map_batches(derive, batch_format="pyarrow")
         .groupby("bucket").map_groups(fold, batch_format="pandas")
         .to_pandas())
    n_multi = int(g["n_multi"].sum())
    n_du = int(g["n_dorm_users"].sum())
    n_ep = int(g["n_episodes"].sum())
    return pd.DataFrame(
        [(n_multi, n_du,
          10000 * n_du // n_multi if n_multi > 0 else -9999, n_ep,
          1000 * int(g["sum_dorm"].sum()) // n_ep if n_ep > 0
          else -9999, int(g["max_dorm"].max()))],
        columns=["n_users_multi_day", "n_dormant_users",
                 "dormant_share_bps", "n_episodes",
                 "mean_dormancy_milli", "max_dormancy_days"]) \
        .astype("int64")


def type_value_drift(sf_dir: str) -> pd.DataFrame:
    """VALUE drift by type — split the stream at its midpoint day
    and compare each event type's exact ceil-rank p50 value cents
    half over half, with the shift in milli
    (1000·p50_h2 // p50_h1 − 1000 when p50_h1 > 0, else -9999). A
    type whose median value moved is a pricing change or an
    instrumentation unit change — count-mix drift monitors miss
    both. Constant span pre-pass + per-block bounded
    (type, half, cents) histogram partials — ZERO shuffle, pure
    integers."""
    ds = _read(sf_dir, "events",
               columns=["event_type", "ts", "value"])

    def span(t: pa.Table) -> pa.Table:
        d = t.column("ts").cast(pa.int64()).to_numpy() // _DAY_US
        return pa.table({"mn": pa.array([int(d.min())]),
                         "mx": pa.array([int(d.max())])})

    sp = ds.map_batches(span, batch_format="pyarrow").to_pandas()
    mid = (int(sp["mn"].min()) + int(sp["mx"].max())) // 2

    def partial(t: pa.Table) -> pa.Table:
        d = t.column("ts").cast(pa.int64()).to_numpy() // _DAY_US
        h = (d > mid).astype(np.int64)
        cents = np.floor(t.column("value").to_numpy() * 100) \
            .astype(np.int64)
        df = pd.DataFrame({"typ": t.column("event_type")
                           .to_pylist(), "h": h, "v": cents})
        g = df.groupby(["typ", "h", "v"], as_index=False).size()
        return pa.Table.from_pandas(
            g.rename(columns={"size": "c"}), preserve_index=False)

    g = (ds.map_batches(partial, batch_format="pyarrow")
         .to_pandas().groupby(["typ", "h", "v"],
                              as_index=False)["c"].sum())

    def p50(sub: pd.DataFrame) -> int:
        sub = sub.sort_values("v")
        n = int(sub["c"].sum())
        cum = sub["c"].cumsum().to_numpy(np.int64)
        rank = (50 * n + 99) // 100
        return int(sub["v"].to_numpy(np.int64)[
            np.searchsorted(cum, rank)])

    rows = []
    for typ in sorted(g["typ"].unique()):
        h1 = g[(g["typ"] == typ) & (g["h"] == 0)]
        h2 = g[(g["typ"] == typ) & (g["h"] == 1)]
        if h1.empty or h2.empty:
            continue
        a, b = p50(h1), p50(h2)
        rows.append((typ, int(h1["c"].sum()), int(h2["c"].sum()),
                     a, b,
                     1000 * b // a - 1000 if a > 0 else -9999))
    out = pd.DataFrame(rows, columns=["event_type", "n_h1", "n_h2",
                                      "p50_h1_cents",
                                      "p50_h2_cents",
                                      "shift_milli"])
    for c in out.columns[1:]:
        out[c] = out[c].astype("int64")
    return out


def first_vs_repeat_priority(sf_dir: str) -> pd.DataFrame:
    """FIRST vs REPEAT urgency — do customers order more urgently
    on their FIRST order than on repeats? Per priority digit:
    first-order count and share (first = the customer's earliest
    order under the (day, orderkey) order), repeat count and share,
    and the first-vs-repeat lift cross-multiplied. A high
    urgent-first lift says acquisition campaigns promise speed —
    onboarding SLAs should match. One ``cust % 64`` exchange of
    slim order rows; buckets lexsort and split first/repeat
    vectorized. Pure integers."""
    ds = _read(sf_dir, "orders",
               columns=["o_custkey", "o_orderdate", "o_orderkey",
                        "o_orderpriority"])

    def derive(t: pa.Table) -> pa.Table:
        c = t.column("o_custkey").to_numpy().astype(np.int64)
        return pa.table({
            "c": pa.array(c),
            "d": pa.array(t.column("o_orderdate").cast(pa.int64())
                          .to_numpy() // _DAY_US),
            "k": t.column("o_orderkey").cast(pa.int64()),
            "p": pa.array(pc.utf8_slice_codeunits(
                t.column("o_orderpriority"), 0, 1)
                .cast(pa.int64()).to_numpy()),
            "bucket": pa.array((c % 64).astype(np.int32))})

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        c = g["c"].to_numpy(np.int64)
        order = np.lexsort((g["k"].to_numpy(np.int64),
                            g["d"].to_numpy(np.int64), c))
        cs = c[order]
        p = g["p"].to_numpy(np.int64)[order]
        first = np.ones(len(cs), dtype=bool)
        first[1:] = cs[1:] != cs[:-1]
        cell = p * 2 + (~first).astype(np.int64)
        cnt = np.bincount(cell, minlength=12).astype(np.int64)
        return pd.DataFrame({"cell": np.arange(12, dtype=np.int64),
                             "c": cnt})

    g = (ds.map_batches(derive, batch_format="pyarrow")
         .groupby("bucket").map_groups(fold, batch_format="pandas")
         .to_pandas().groupby("cell")["c"].sum())
    grid = np.zeros(12, dtype=np.int64)
    grid[g.index.to_numpy()] = g.to_numpy()
    grid = grid.reshape(6, 2)
    f_tot = int(grid[:, 0].sum())
    r_tot = int(grid[:, 1].sum())
    rows = []
    for p in range(6):
        f, r = int(grid[p, 0]), int(grid[p, 1])
        if f + r == 0:
            continue
        fs = 10000 * f // f_tot if f_tot > 0 else -9999
        rs = 10000 * r // r_tot if r_tot > 0 else -9999
        lift = (1000 * f * r_tot // (f_tot * r) - 1000
                if f_tot > 0 and r > 0 else -9999)
        rows.append((p, f, fs, r, rs, lift))
    return pd.DataFrame(rows, columns=["priority", "n_first",
                                       "first_share_bps",
                                       "n_repeat",
                                       "repeat_share_bps",
                                       "lift_milli"]).astype(
        "int64")


def supplier_lead_time_laggards(sf_dir: str) -> pd.DataFrame:
    """LEAD-TIME laggards — the 10 slowest suppliers by mean
    order-to-ship days (truncating milli mean, support ≥ 50 lines,
    ties by smaller key). The vendor-scorecard bottom: chronic
    laggards gate every promise-date model downstream. Scale shape:
    tagged-union ``order % 64`` hash join attaches the order day to
    each line, then per-block supplier partial sums fold on the
    driver (suppliers are dimension-sized). Pure integers."""
    li = (_read(sf_dir, "lineitem",
                columns=["l_orderkey", "l_suppkey", "l_shipdate"])
          .map_batches(lambda t: pa.table({
              "k": t.column("l_orderkey").cast(pa.int64()),
              "s": t.column("l_suppkey").cast(pa.int64()),
              "d": pa.array(t.column("l_shipdate").cast(pa.int64())
                            .to_numpy() // _DAY_US),
              "bucket": pc.cast(pc.bit_wise_and(
                  t.column("l_orderkey").cast(pa.int64()), 63),
                  pa.int32())}), batch_format="pyarrow"))
    od = (_read(sf_dir, "orders",
                columns=["o_orderkey", "o_orderdate"])
          .map_batches(lambda t: pa.table({
              "k": t.column("o_orderkey").cast(pa.int64()),
              "s": pa.array(np.full(len(t), -1, np.int64)),
              "d": pa.array(t.column("o_orderdate").cast(pa.int64())
                            .to_numpy() // _DAY_US),
              "bucket": pc.cast(pc.bit_wise_and(
                  t.column("o_orderkey").cast(pa.int64()), 63),
                  pa.int32())}), batch_format="pyarrow"))

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        o = g[g["s"] < 0][["k", "d"]].rename(columns={"d": "od"})
        l_ = g[g["s"] >= 0]
        m = l_.merge(o, on="k")
        lag = m["d"].to_numpy(np.int64) - m["od"].to_numpy(np.int64)
        su, inv = np.unique(m["s"].to_numpy(np.int64),
                            return_inverse=True)
        n = np.bincount(inv, minlength=len(su)).astype(np.int64)
        s = np.zeros(len(su), np.int64)
        np.add.at(s, inv, lag)
        return pd.DataFrame({"s": su, "n": n, "sum_lag": s})

    g = (li.union(od).groupby("bucket")
         .map_groups(fold, batch_format="pandas")
         .to_pandas().groupby("s", as_index=False)[["n", "sum_lag"]]
         .sum())
    g = g[g["n"] >= 50].copy()
    g["mean_milli"] = 1000 * g["sum_lag"].to_numpy(np.int64) \
        // g["n"].to_numpy(np.int64)
    g = g.sort_values(["mean_milli", "s"],
                      ascending=[False, True],
                      kind="mergesort").head(10)
    return pd.DataFrame({
        "s_suppkey": g["s"].to_numpy(np.int64),
        "n_lines": g["n"].to_numpy(np.int64),
        "mean_lead_milli": g["mean_milli"].to_numpy(np.int64)
    }).reset_index(drop=True).astype("int64")


def revenue_by_hour(sf_dir: str) -> pd.DataFrame:
    """REVENUE by hour — when is the money actually made? Per hour
    of day: event count, value cents, value share in exact bps, and
    the value-per-event lift vs the global rate cross-multiplied
    (1000·cents·N // (n·TOTAL) − 1000). Hours where value-lift and
    traffic diverge are when big spenders shop — maintenance
    windows and ad budgets both move off this table. Per-block
    24-cell partials — ZERO shuffle, pure integers."""
    ds = _read(sf_dir, "events", columns=["ts", "value"])

    def partial(t: pa.Table) -> pa.Table:
        h = (t.column("ts").cast(pa.int64()).to_numpy()
             // 3_600_000_000) % 24
        cents = np.floor(t.column("value").to_numpy() * 100) \
            .astype(np.int64)
        n = np.bincount(h, minlength=24).astype(np.int64)
        s = np.zeros(24, np.int64)
        np.add.at(s, h, cents)
        return pa.table({"h": pa.array(np.arange(24,
                                                 dtype=np.int64)),
                         "n": pa.array(n), "s": pa.array(s)})

    g = (ds.map_batches(partial, batch_format="pyarrow")
         .to_pandas().groupby("h", as_index=False)[["n", "s"]]
         .sum().sort_values("h").reset_index(drop=True))
    g = g[g["n"] > 0]
    n_tot = int(g["n"].sum())
    s_tot = int(g["s"].sum())
    rows = []
    for h, n, s in zip(g["h"].tolist(), g["n"].tolist(),
                       g["s"].tolist()):
        rows.append((int(h), int(n), int(s),
                     10000 * int(s) // s_tot,
                     1000 * int(s) * n_tot // (int(n) * s_tot)
                     - 1000))
    return pd.DataFrame(rows, columns=["hour", "n_events",
                                       "value_cents",
                                       "value_share_bps",
                                       "vpe_lift_milli"]) \
        .astype("int64")


def type_precedence_matrix(sf_dir: str) -> pd.DataFrame:
    """PRECEDENCE matrix — within a (user, day), when two event
    types both fire, which one fires FIRST? For every unordered
    type pair (a < b lexicographically): the days both appear, and
    the share where a's first arrival (ties broken by event_id)
    precedes b's, in exact bps. A funnel assumption ("view before
    purchase") is exactly a cell of this matrix — measured, not
    assumed. Per-block per-(user, day, type) first-candidate
    extraction into one ``user % 64`` exchange; buckets resolve
    global firsts and compare pairs vectorized per key. Pure
    integers."""
    ds = _read(sf_dir, "events",
               columns=["user_id", "ts", "event_id", "event_type"])

    def derive(t: pa.Table) -> pa.Table:
        u = t.column("user_id").to_numpy().astype(np.int64)
        ts = t.column("ts").cast(pa.int64()).to_numpy()
        e = t.column("event_id").to_numpy().astype(np.int64)
        d = ts // _DAY_US
        typ, tinv = np.unique(t.column("event_type").to_numpy(),
                              return_inverse=True)
        key = (u * 32768 + (d % 32768)) * 8 + tinv
        order = np.lexsort((e, ts, key))
        ks = key[order]
        first = np.ones(len(ks), dtype=bool)
        first[1:] = ks[1:] != ks[:-1]
        keep = order[first]
        return pa.table({"ud": pa.array(key[keep] // 8),
                         "typ": t.column("event_type").take(
                             pa.array(keep)),
                         "ts": pa.array(ts[keep]),
                         "e": pa.array(e[keep]),
                         "bucket": pa.array(((key[keep] // 8
                                              // 32768) % 64)
                                            .astype(np.int32))})

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        m = (g.sort_values(["ud", "typ", "ts", "e"])
             .drop_duplicates(["ud", "typ"]))
        pairs = m.merge(m, on="ud")
        pairs = pairs[pairs["typ_x"] < pairs["typ_y"]]
        a_first = (pairs["ts_x"] < pairs["ts_y"]) | \
            ((pairs["ts_x"] == pairs["ts_y"])
             & (pairs["e_x"] < pairs["e_y"]))
        out = pd.DataFrame({"a": pairs["typ_x"],
                            "b": pairs["typ_y"],
                            "af": a_first.astype(np.int64),
                            "n": 1})
        return out.groupby(["a", "b"], as_index=False)[["af",
                                                        "n"]].sum()

    g = (ds.map_batches(derive, batch_format="pyarrow")
         .groupby("bucket").map_groups(fold, batch_format="pandas")
         .to_pandas().groupby(["a", "b"], as_index=False)[["af",
                                                           "n"]]
         .sum().sort_values(["a", "b"]).reset_index(drop=True))
    return pd.DataFrame({
        "type_a": g["a"], "type_b": g["b"],
        "n_days_both": g["n"].astype("int64"),
        "a_first_bps": (10000 * g["af"].to_numpy(np.int64)
                        // g["n"].to_numpy(np.int64))}).astype(
        {"n_days_both": "int64", "a_first_bps": "int64"})


def source_mix_drift(sf_dir: str) -> pd.DataFrame:
    """SOURCE-MIX drift — split the corpus at the doc_id midpoint
    (ingestion-order proxy) and compare each source's token share
    half over half, with the shift in milli
    (1000·share2·T1 // (share1·T2) − 1000 cross-multiplied as
    1000·tok2·T1 // (tok1·T2) − 1000). A drifting mix silently
    re-weights every model trained on "the corpus" — the dataset
    version-diff one actually needs. Constant id-span pre-pass +
    vectorized per-block (source, half) token partials — ZERO
    shuffle, pure integers."""
    ds = _read(sf_dir, "documents", columns=["doc_id", "source",
                                             "text"])

    def span(t: pa.Table) -> pa.Table:
        i = t.column("doc_id").to_numpy().astype(np.int64)
        return pa.table({"mn": pa.array([int(i.min())]),
                         "mx": pa.array([int(i.max())])})

    sp = ds.map_batches(span, batch_format="pyarrow").to_pandas()
    mid = (int(sp["mn"].min()) + int(sp["mx"].max())) // 2

    def partial(t: pa.Table) -> pa.Table:
        i = t.column("doc_id").to_numpy().astype(np.int64)
        h = (i > mid).astype(np.int64)
        tok = pc.count_substring(t.column("text"), " ") \
            .to_numpy().astype(np.int64) + 1
        df = pd.DataFrame({"source": t.column("source")
                           .to_pylist(), "h": h, "tok": tok})
        g = df.groupby(["source", "h"], as_index=False)["tok"].sum()
        return pa.Table.from_pandas(g, preserve_index=False)

    g = (ds.map_batches(partial, batch_format="pyarrow")
         .to_pandas().groupby(["source", "h"], as_index=False)
         ["tok"].sum())
    t1 = int(g.loc[g["h"] == 0, "tok"].sum())
    t2 = int(g.loc[g["h"] == 1, "tok"].sum())
    rows = []
    for src_ in sorted(g["source"].unique()):
        a = int(g.loc[(g["source"] == src_) & (g["h"] == 0),
                      "tok"].sum())
        b = int(g.loc[(g["source"] == src_) & (g["h"] == 1),
                      "tok"].sum())
        shift = (1000 * b * t1 // (a * t2) - 1000
                 if a > 0 and t2 > 0 else -9999)
        rows.append((src_, a, b,
                     10000 * a // t1 if t1 > 0 else -9999,
                     10000 * b // t2 if t2 > 0 else -9999, shift))
    out = pd.DataFrame(rows, columns=["source", "tok_h1", "tok_h2",
                                      "share_h1_bps",
                                      "share_h2_bps",
                                      "shift_milli"])
    for c in out.columns[1:]:
        out[c] = out[c].astype("int64")
    return out


def order_value_dup_audit(sf_dir: str) -> pd.DataFrame:
    """DUPLICATE-CHARGE audit — does the same customer carry
    multiple orders with the IDENTICAL total cents? Customers with
    any exact-value collision, collision groups, orders inside
    them, and the biggest group — double-submits and billing
    retries land here long before a refund ticket does (organic
    exact-cents ties are rare at 7-digit totals). One ``cust % 64``
    exchange of per-block (customer, cents) pair counts; buckets
    fold multiplicities vectorized. Pure integers."""
    ds = _read(sf_dir, "orders",
               columns=["o_custkey", "o_totalprice"])

    def derive(t: pa.Table) -> pa.Table:
        c = t.column("o_custkey").to_numpy().astype(np.int64)
        v = np.floor(t.column("o_totalprice").to_numpy() * 100) \
            .astype(np.int64)
        df = pd.DataFrame({"c": c, "v": v})
        g = df.groupby(["c", "v"], as_index=False).size()
        g["bucket"] = (g["c"].to_numpy(np.int64) % 64) \
            .astype(np.int32)
        return pa.Table.from_pandas(
            g.rename(columns={"size": "k"}), preserve_index=False)

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        gg = g.groupby(["c", "v"], as_index=False)["k"].sum()
        k = gg["k"].to_numpy(np.int64)
        dup = k >= 2
        cu = gg["c"].to_numpy(np.int64)
        n_cust = len(np.unique(cu))
        n_dup_cust = len(np.unique(cu[dup]))
        return pd.DataFrame(
            [(n_cust, n_dup_cust, int(dup.sum()),
              int(k[dup].sum()),
              int(k.max()) if len(k) else 0)],
            columns=["n_cust", "n_dup_cust", "n_groups",
                     "n_orders_in_groups", "max_group"])

    g = (ds.map_batches(derive, batch_format="pyarrow")
         .groupby("bucket").map_groups(fold, batch_format="pandas")
         .to_pandas())
    n_cust = int(g["n_cust"].sum())
    n_dup = int(g["n_dup_cust"].sum())
    return pd.DataFrame(
        [(n_cust, n_dup, 10000 * n_dup // n_cust,
          int(g["n_groups"].sum()),
          int(g["n_orders_in_groups"].sum()),
          int(g["max_group"].max()))],
        columns=["n_customers_ordering", "n_cust_with_dup_value",
                 "dup_cust_bps", "n_collision_groups",
                 "n_orders_in_groups", "max_group"]) \
        .astype("int64")


def embedding_norm_drift(sf_dir: str) -> pd.DataFrame:
    """NORM drift — split the vector table at its vec_id midpoint
    (ingestion-order proxy) and compare the exact fixed-point mean
    squared norm half over half, with the shift in milli. A norm
    seam at some id boundary means the corpus was embedded by two
    model versions (or one run lost its L2 normalization) — cosine
    scores across the seam are incomparable. Constant id-span
    pre-pass + per-block (half, sum, count) partials — ZERO
    shuffle, pure integers."""
    ds = _read(sf_dir, "embeddings",
               columns=["vec_id", "embedding"], rows_per_block=4096)

    def span(t: pa.Table) -> pa.Table:
        i = t.column("vec_id").to_numpy().astype(np.int64)
        return pa.table({"mn": pa.array([int(i.min())]),
                         "mx": pa.array([int(i.max())])})

    sp = ds.map_batches(span, batch_format="pyarrow").to_pandas()
    mid = (int(sp["mn"].min()) + int(sp["mx"].max())) // 2

    def partial(t: pa.Table) -> pa.Table:
        i = t.column("vec_id").to_numpy().astype(np.int64)
        h = (i > mid).astype(np.int64)
        m = np.floor(np.stack(t.column("embedding").to_numpy(
            zero_copy_only=False)).astype(np.float64) * 1e6) \
            .astype(np.int64)
        n2 = (m * m).sum(axis=1)
        s = np.zeros(2, np.int64)
        np.add.at(s, h, n2)
        n = np.bincount(h, minlength=2).astype(np.int64)
        return pa.table({"h": pa.array(np.arange(2,
                                                 dtype=np.int64)),
                         "s": pa.array(s), "n": pa.array(n)})

    g = (ds.map_batches(partial, batch_format="pyarrow")
         .to_pandas().groupby("h")[["s", "n"]].sum())
    n1, n2_ = int(g["n"].get(0, 0)), int(g["n"].get(1, 0))
    m1 = int(g["s"].get(0, 0)) // n1 if n1 > 0 else -9999
    m2 = int(g["s"].get(1, 0)) // n2_ if n2_ > 0 else -9999
    shift = (1000 * m2 // m1 - 1000
             if n1 > 0 and n2_ > 0 and m1 > 0 else -9999)
    return pd.DataFrame(
        [(n1, n2_, m1, m2, shift)],
        columns=["n_h1", "n_h2", "mean_norm2_h1_fp",
                 "mean_norm2_h2_fp", "shift_milli"]) \
        .astype("int64")


def vocab_core_census(sf_dir: str) -> pd.DataFrame:
    """CORE-VOCABULARY census — how much of the token vocabulary is
    CORE (appears in every source) vs exclusive to exactly one?
    Distinct tokens, core count, single-source count, shares in
    exact bps, and the source-coverage histogram's mean in milli. A
    vocabulary that is mostly source-exclusive means per-source
    tokenizers or vocab pruning will not transfer — the
    shared-subword-budget datum. One ``token-hash % 64`` exchange
    of per-block distinct (token, source) pairs; buckets count
    distinct sources per token. Pure integers."""
    ds = _read(sf_dir, "documents", columns=["source", "text"])
    n_sources = int(_read(sf_dir, "documents", columns=["source"])
                    .map_batches(
        lambda t: pa.table({"s": pa.array(
            np.unique(t.column("source").to_numpy()))}),
        batch_format="pyarrow").to_pandas()["s"].nunique())

    def derive(t: pa.Table) -> pa.Table:
        df = pd.DataFrame({"source": t.column("source")
                           .to_pylist(),
                           "tok": t.column("text").to_pylist()})
        ex = df.assign(tok=df["tok"].str.split(" ")).explode("tok")
        ex = ex.drop_duplicates()
        h = pd.util.hash_array(ex["tok"].to_numpy(object)) % 64
        ex["bucket"] = h.astype(np.int32)
        return pa.Table.from_pandas(ex, preserve_index=False)

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates(["tok", "source"])
        cov = g.groupby("tok").size().to_numpy(np.int64)
        return pd.DataFrame(
            [(len(cov), int((cov >= n_sources).sum()),
              int((cov == 1).sum()), int(cov.sum()))],
            columns=["n_tokens", "n_core", "n_single", "sum_cov"])

    g = (ds.map_batches(derive, batch_format="pyarrow")
         .groupby("bucket").map_groups(fold, batch_format="pandas")
         .to_pandas())
    n_tok = int(g["n_tokens"].sum())
    n_core = int(g["n_core"].sum())
    n_single = int(g["n_single"].sum())
    return pd.DataFrame(
        [(n_sources, n_tok, n_core, 10000 * n_core // n_tok,
          n_single, 10000 * n_single // n_tok,
          1000 * int(g["sum_cov"].sum()) // n_tok)],
        columns=["n_sources", "n_tokens", "n_core",
                 "core_share_bps", "n_single_source",
                 "single_share_bps", "mean_coverage_milli"]) \
        .astype("int64")


def type_adoption_rank(sf_dir: str) -> pd.DataFrame:
    """ADOPTION order — in what order do users discover event
    types? Per user, each type used gets its adoption rank (1 =
    first type ever used, by first arrival under the total
    (ts, event_id) order); per type: adopter count, the truncating
    milli mean rank and the rank-1 share in exact bps. The
    onboarding-path table: a type with mean rank ~1 is the entry
    point; high mean rank is a power-user feature. One
    ``user % 64`` exchange of per-block (user, type)
    first-candidates; buckets resolve global firsts, rank within
    user, and emit per-type partials. Pure integers."""
    ds = _read(sf_dir, "events",
               columns=["user_id", "ts", "event_id", "event_type"])

    def derive(t: pa.Table) -> pa.Table:
        u = t.column("user_id").to_numpy().astype(np.int64)
        ts = t.column("ts").cast(pa.int64()).to_numpy()
        e = t.column("event_id").to_numpy().astype(np.int64)
        typ, tinv = np.unique(t.column("event_type").to_numpy(),
                              return_inverse=True)
        key = u * 8 + tinv
        order = np.lexsort((e, ts, key))
        ks = key[order]
        first = np.ones(len(ks), dtype=bool)
        first[1:] = ks[1:] != ks[:-1]
        keep = order[first]
        return pa.table({"u": pa.array(u[keep]),
                         "typ": t.column("event_type").take(
                             pa.array(keep)),
                         "ts": pa.array(ts[keep]),
                         "e": pa.array(e[keep]),
                         "bucket": pa.array((u[keep] % 64)
                                            .astype(np.int32))})

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        m = (g.sort_values(["u", "typ", "ts", "e"])
             .drop_duplicates(["u", "typ"])
             .sort_values(["u", "ts", "e"]))
        u = m["u"].to_numpy(np.int64)
        first = np.ones(len(u), dtype=bool)
        first[1:] = u[1:] != u[:-1]
        grp_start = np.where(first)[0]
        rank = np.arange(len(u), dtype=np.int64) \
            - np.repeat(grp_start, np.diff(
                np.append(grp_start, len(u)))) + 1
        out = pd.DataFrame({"typ": m["typ"].to_numpy(),
                            "rank": rank, "r1": (rank == 1)
                            .astype(np.int64), "n": 1})
        return out.groupby("typ", as_index=False).agg(
            n=("n", "sum"), sum_rank=("rank", "sum"),
            n_rank1=("r1", "sum"))

    g = (ds.map_batches(derive, batch_format="pyarrow")
         .groupby("bucket").map_groups(fold, batch_format="pandas")
         .to_pandas().groupby("typ", as_index=False)
         .agg(n=("n", "sum"), sum_rank=("sum_rank", "sum"),
              n_rank1=("n_rank1", "sum"))
         .sort_values("typ").reset_index(drop=True))
    return pd.DataFrame({
        "event_type": g["typ"],
        "n_adopters": g["n"].astype("int64"),
        "mean_rank_milli": (1000 * g["sum_rank"].to_numpy(np.int64)
                            // g["n"].to_numpy(np.int64)),
        "rank1_share_bps": (10000 * g["n_rank1"]
                            .to_numpy(np.int64)
                            // g["n"].to_numpy(np.int64))
    }).astype({"n_adopters": "int64", "mean_rank_milli": "int64",
               "rank1_share_bps": "int64"})


def orders_status_boundary_audit(sf_dir: str) -> pd.DataFrame:
    """ORDER-STATUS boundary audit — O (open), F (fulfilled) and P
    (partial) should partition the timeline around the data's cut
    date. Per status: order count and min/max epoch order day, plus
    the F-to-O overlap width in days (positive = status is not
    derivable from the date; the orders-side sibling of
    ``linestatus_boundary_audit``, and the P band should sit inside
    that overlap). Per-block constant-cell partials — ZERO shuffle,
    pure integers."""
    ds = _read(sf_dir, "orders",
               columns=["o_orderstatus", "o_orderdate"])

    def partial(t: pa.Table) -> pa.Table:
        d = t.column("o_orderdate").cast(pa.int64()).to_numpy() \
            // _DAY_US
        df = pd.DataFrame({"st": t.column("o_orderstatus")
                           .to_pylist(), "d": d})
        g = df.groupby("st").agg(n=("d", "size"), mn=("d", "min"),
                                 mx=("d", "max")).reset_index()
        return pa.Table.from_pandas(g, preserve_index=False)

    g = (ds.map_batches(partial, batch_format="pyarrow")
         .to_pandas().groupby("st")
         .agg(n=("n", "sum"), mn=("mn", "min"), mx=("mx", "max")))
    stats = {st: (int(r["n"]), int(r["mn"]), int(r["mx"]))
             for st, r in g.iterrows()}
    overlap = -1
    if "F" in stats and "O" in stats:
        overlap = stats["F"][2] - stats["O"][1] + 1
    rows = [(st, *stats[st], overlap) for st in sorted(stats)]
    return pd.DataFrame(rows, columns=["orderstatus", "n_orders",
                                       "min_day", "max_day",
                                       "overlap_days"]).astype(
        {"n_orders": "int64", "min_day": "int64",
         "max_day": "int64", "overlap_days": "int64"})


def supplier_focus_census(sf_dir: str) -> pd.DataFrame:
    """FOCUS census — is each supplier a one-part pony? Per
    supplier the Herfindahl of its line volume across parts
    (HHI·1e4 = Σc²·1e4 // (Σc)²), banded diversified (<1000),
    moderate (<2500), concentrated (<5000), focused (≥5000), with
    single-part suppliers separate and shares in exact bps. A
    focused supply base concentrates failure modes part by part —
    the procurement-risk complement to the nation-level activity
    HHI. One ``supp % 64`` exchange of per-block (supplier, part)
    counts; buckets fold HHIs in exact integers. Pure integers."""
    ds = _read(sf_dir, "lineitem",
               columns=["l_suppkey", "l_partkey"])

    def derive(t: pa.Table) -> pa.Table:
        s = t.column("l_suppkey").to_numpy().astype(np.int64)
        p = t.column("l_partkey").to_numpy().astype(np.int64)
        key = s * (1 << 32) + p
        uk, cnt = np.unique(key, return_counts=True)
        return pa.table({"s": pa.array(uk >> 32),
                         "p": pa.array(uk & ((1 << 32) - 1)),
                         "c": pa.array(cnt.astype(np.int64)),
                         "bucket": pa.array(((uk >> 32) % 64)
                                            .astype(np.int32))})

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        key = g["s"].to_numpy(np.int64) * (1 << 32) \
            + g["p"].to_numpy(np.int64)
        uk, inv = np.unique(key, return_inverse=True)
        c = np.zeros(len(uk), np.int64)
        np.add.at(c, inv, g["c"].to_numpy(np.int64))
        su, sinv = np.unique(uk >> 32, return_inverse=True)
        tot = np.zeros(len(su), np.int64)
        np.add.at(tot, sinv, c)
        ss = np.zeros(len(su), np.int64)
        np.add.at(ss, sinv, c * c)
        nparts = np.bincount(sinv, minlength=len(su)) \
            .astype(np.int64)
        hhi = 10000 * ss // (tot * tot)
        band = np.where(nparts == 1, 0,
                        np.where(hhi < 1000, 1,
                                 np.where(hhi < 2500, 2,
                                          np.where(hhi < 5000, 3,
                                                   4))))
        h = np.bincount(band, minlength=5).astype(np.int64)
        return pd.DataFrame({"band": np.arange(5, dtype=np.int64),
                             "n_suppliers": h})

    g = (ds.map_batches(derive, batch_format="pyarrow")
         .groupby("bucket").map_groups(fold, batch_format="pandas")
         .to_pandas().groupby("band", as_index=False).sum())
    tot = int(g["n_suppliers"].sum())
    g = g[g["n_suppliers"] > 0].sort_values("band").reset_index(
        drop=True)
    g["share_bps"] = 10000 * g["n_suppliers"].to_numpy(np.int64) \
        // tot
    return g.astype("int64")


def ts_collision_audit(sf_dir: str) -> pd.DataFrame:
    """TIMESTAMP-COLLISION audit — how often do two events share
    the EXACT microsecond? Colliding timestamps, events inside
    collisions with share in exact bps, and the worst pile-up. A
    heavy collision rate means the clock is coarser than the column
    type claims (second-granularity feeds cast to microseconds) —
    and every (ts)-ordered window without a tie-breaker is
    nondeterministic. One ``ts % 64`` exchange of per-block
    (ts, count) rollups; buckets fold multiplicities. Pure
    integers."""
    ds = _read(sf_dir, "events", columns=["ts"])

    def derive(t: pa.Table) -> pa.Table:
        ts = t.column("ts").cast(pa.int64()).to_numpy()
        uk, cnt = np.unique(ts, return_counts=True)
        return pa.table({"ts": pa.array(uk),
                         "k": pa.array(cnt.astype(np.int64)),
                         "bucket": pa.array((uk % 64)
                                            .astype(np.int32))})

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        gg = g.groupby("ts", as_index=False)["k"].sum()
        k = gg["k"].to_numpy(np.int64)
        col = k >= 2
        return pd.DataFrame(
            [(len(k), int(k.sum()), int(col.sum()),
              int(k[col].sum()), int(k.max()) if len(k) else 0)],
            columns=["n_ts", "n_events", "n_collision_ts",
                     "n_events_in_collisions", "max_pileup"])

    g = (ds.map_batches(derive, batch_format="pyarrow")
         .groupby("bucket").map_groups(fold, batch_format="pandas")
         .to_pandas())
    n_events = int(g["n_events"].sum())
    n_in = int(g["n_events_in_collisions"].sum())
    return pd.DataFrame(
        [(int(g["n_ts"].sum()), n_events,
          int(g["n_collision_ts"].sum()), n_in,
          10000 * n_in // n_events, int(g["max_pileup"].max()))],
        columns=["n_distinct_ts", "n_events", "n_collision_ts",
                 "n_events_in_collisions", "collision_bps",
                 "max_pileup"]).astype("int64")


def value_band_type_mix(sf_dir: str) -> pd.DataFrame:
    """VALUE-BAND type mix — which event types dominate the
    big-ticket end? Events band by fixed cent thresholds (0, <100,
    <1000, <10000, ≥10000); per (band, type): count, the
    within-band type share in exact bps, and the lift vs the type's
    global share cross-multiplied. If errors concentrate in the top
    band, the expensive flow is the broken one — severity-weighted
    triage in one table. Per-block constant-cell partials — ZERO
    shuffle, pure integers."""
    ds = _read(sf_dir, "events", columns=["event_type", "value"])

    def partial(t: pa.Table) -> pa.Table:
        cents = np.floor(t.column("value").to_numpy() * 100) \
            .astype(np.int64)
        band = np.where(cents == 0, 0,
                        np.where(cents < 100, 1,
                                 np.where(cents < 1000, 2,
                                          np.where(cents < 10000,
                                                   3, 4))))
        df = pd.DataFrame({"typ": t.column("event_type")
                           .to_pylist(), "band": band})
        g = df.groupby(["band", "typ"], as_index=False).size()
        return pa.Table.from_pandas(
            g.rename(columns={"size": "n"}), preserve_index=False)

    g = (ds.map_batches(partial, batch_format="pyarrow")
         .to_pandas().groupby(["band", "typ"], as_index=False)["n"]
         .sum())
    n_tot = int(g["n"].sum())
    rn = g.groupby("band")["n"].sum()
    cn = g.groupby("typ")["n"].sum()
    g = g.sort_values(["band", "typ"],
                      kind="mergesort").reset_index(drop=True)
    rows = []
    for band, typ, n in g.itertuples(index=False):
        r, c = int(rn[band]), int(cn[typ])
        rows.append((int(band), typ, int(n), 10000 * int(n) // r,
                     1000 * int(n) * n_tot // (r * c) - 1000))
    return pd.DataFrame(rows, columns=["value_band", "event_type",
                                       "n_events",
                                       "band_share_bps",
                                       "lift_milli"]).astype(
        {"value_band": "int64", "n_events": "int64",
         "band_share_bps": "int64", "lift_milli": "int64"})
