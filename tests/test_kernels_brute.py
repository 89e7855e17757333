"""Brute-force regression tests for the vectorized sequence kernels.

The driver's DuckDB oracle checks these operators on the standard
testdata; this module re-checks the trickiest vectorized kernels
against naive pure-Python reference implementations on ADVERSARIAL
synthetic inputs — timestamp ties, single-event users, constant-value
users, users spanning many blocks — that the benchmark tables do not
guarantee to contain. Deterministic seeded data; no DuckDB involved.
"""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


def _make_events_dir(tmp_path, n=400, users=7, ts_mod=50, seed=7):
    """Tiny events table with heavy ts collisions (ts_mod distinct
    timestamps) and a single-event user and a constant-value user."""
    rng = np.random.RandomState(seed)
    uid = rng.randint(0, users, n).astype(np.int64)
    uid[0] = 990                              # single-event user
    const_u = 991                             # constant-value user
    uid[1:6] = const_u
    ts_us = (rng.randint(0, ts_mod, n).astype(np.int64)
             * 1_800_000_000 + 1_600_000_000_000_000)
    val = np.round(rng.uniform(0.01, 400.0, n), 2)
    val[1:6] = 42.0
    et = np.array(["click", "view", "purchase"])[rng.randint(0, 3, n)]
    tbl = pa.table({
        "event_id": pa.array(np.arange(n, dtype=np.int64)),
        "ts": pa.array(ts_us, type=pa.int64()).cast(pa.timestamp("us")),
        "user_id": pa.array(uid),
        "event_type": pa.array(et),
        "value": pa.array(val),
        "props": pa.array(["{}"] * n)})
    d = tmp_path / "sf_brute"
    d.mkdir()
    pq.write_table(tbl, d / "events.parquet")
    df = tbl.to_pandas()
    df["ts_us"] = ts_us
    df["cents"] = np.floor(val * 100).astype(np.int64)
    return str(d), df


@pytest.fixture(scope="module")
def events_case(tmp_path_factory):
    return _make_events_dir(tmp_path_factory.mktemp("brute"))


def _ordered(df):
    return df.sort_values(["user_id", "ts_us", "event_id"])


def test_user_first_last_brute(events_case):
    from container_crawler_ray.pipelines.analytics import user_first_last
    d, df = events_case
    got = user_first_last(d)
    for _, row in got.iterrows():
        g = _ordered(df[df.user_id == row.user_id])
        assert row.first_type == g.iloc[0].event_type
        assert row.last_type == g.iloc[-1].event_type
        assert row.delta_cents == g.iloc[-1].cents - g.iloc[0].cents
    assert set(got.user_id) == set(df.user_id)


def test_events_burst_max_brute(events_case):
    from container_crawler_ray.pipelines.analytics import events_burst_max
    d, df = events_case
    got = events_burst_max(d).set_index("user_id")
    hour = 3_600_000_000
    for u, g in df.groupby("user_id"):
        ts = np.sort(g.ts_us.to_numpy())
        best = max(int(((ts >= t) & (ts <= t + hour)).sum()) for t in ts)
        assert got.loc[u, "max_burst"] == best
        assert got.loc[u, "n_events"] == len(ts)


def test_events_ntile_brute(events_case):
    from container_crawler_ray.pipelines.analytics import events_ntile
    d, df = events_case
    got = events_ntile(d)
    order = df.sort_values(["cents", "event_id"]).reset_index(drop=True)
    n, k = len(order), 4
    base, rem = n // k, n % k
    expect = {}
    r = 0
    for t in range(1, k + 1):
        size = base + (1 if t <= rem else 0)
        for _ in range(size):
            expect[int(order.iloc[r].event_id)] = t
            r += 1
    for _, row in got.iterrows():
        assert row.ntile == expect[row.event_id]


def test_user_daily_locf_brute(events_case):
    from container_crawler_ray.pipelines.analytics import (
        user_daily_locf, _DAY_US)
    d, df = events_case
    got = user_daily_locf(d)
    day_lo = int(df.ts_us.min()) // _DAY_US
    day_hi = int(df.ts_us.max()) // _DAY_US
    expect = []
    for u, g in df.groupby("user_id"):
        g = _ordered(g)
        for day in range(day_lo, day_hi + 1):
            de = (day + 1) * _DAY_US
            prior = g[g.ts_us < de]
            if len(prior):
                expect.append((u, day, int(prior.iloc[-1].cents)))
    exp = pd.DataFrame(expect, columns=["user_id", "day_id",
                                        "cents_locf"])
    exp = exp.sort_values(["user_id", "day_id"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got.astype("int64"), exp.astype("int64"))


def test_events_autocorr_variance_gate(events_case):
    """Constant-value and single-event users must be absent (no NaN)."""
    from container_crawler_ray.pipelines.analytics import (
        events_autocorr_lag1)
    d, df = events_case
    got = events_autocorr_lag1(d)
    assert 990 not in set(got.user_id)          # no pairs
    assert 991 not in set(got.user_id)          # zero variance
    assert got.ac1_milli.between(-1000, 1000).all()


def test_user_band_runs_brute(events_case):
    from container_crawler_ray.pipelines.analytics import user_band_runs
    d, df = events_case
    got = user_band_runs(d)
    for u, g in df.groupby("user_id"):
        g = _ordered(g)
        bands = (g.cents // 2000).to_numpy()
        runs = []
        for b in bands:
            if not runs or runs[-1][0] != b:
                runs.append([b, 0])
            runs[-1][1] += 1
        mine = got[got.user_id == u]
        assert list(mine.band) == [r[0] for r in runs]
        assert list(mine.n_events) == [r[1] for r in runs]
        assert list(mine.run_idx) == list(range(1, len(runs) + 1))


def test_user_feature_matrix_consistency(events_case):
    """The fused single-exchange feature matrix must equal the
    standalone oracled operators column-for-column."""
    from container_crawler_ray.pipelines.analytics import (
        user_feature_matrix, user_first_last, user_active_seconds,
        events_burst_max, events_autocorr_lag1)
    d, _ = events_case
    fm = user_feature_matrix(d).set_index("user_id")
    fl = user_first_last(d).set_index("user_id")
    assert (fm["delta_cents"] == fl["delta_cents"]).all()
    ac = user_active_seconds(d).set_index("user_id")
    assert (fm.loc[ac.index, "active_us"] == ac["active_us"]).all()
    assert (fm.loc[ac.index, "n_islands"] == ac["n_islands"]).all()
    bm = events_burst_max(d).set_index("user_id")
    assert (fm["max_burst"] == bm["max_burst"]).all()
    assert (fm["n_events"] == bm["n_events"]).all()
    a1 = events_autocorr_lag1(d).set_index("user_id")
    assert (fm.loc[a1.index, "ac1_milli"] == a1["ac1_milli"]).all()
    gated = fm.index.difference(a1.index)
    assert (fm.loc[gated, "ac1_milli"] == 0).all()


def test_events_ohlc_brute(events_case):
    from container_crawler_ray.pipelines.analytics import events_ohlc
    d, df = events_case
    got = events_ohlc(d)
    hour = 3_600_000_000
    exp = {}
    for (u, h), g in df.assign(hour_id=df.ts_us // hour) \
            .groupby(["user_id", "hour_id"]):
        g = g.sort_values(["ts_us", "event_id"])
        exp[(u, h)] = (int(g.iloc[0].cents), int(g.cents.max()),
                       int(g.cents.min()), int(g.iloc[-1].cents),
                       len(g))
    assert len(got) == len(exp)
    for _, r in got.iterrows():
        assert exp[(r.user_id, r.hour_id)] == (
            r.open_cents, r.high_cents, r.low_cents, r.close_cents, r.n)


def test_user_twap_brute(events_case):
    from container_crawler_ray.pipelines.analytics import user_twap
    d, df = events_case
    got = user_twap(d).set_index("user_id")
    for u, g in df.groupby("user_id"):
        g = g.sort_values(["ts_us", "event_id"])
        ts = g.ts_us.to_numpy()
        c = g.cents.to_numpy()
        if len(g) < 2:
            assert u not in got.index
            continue
        gaps = (ts[1:] - ts[:-1]) // 1_000_000
        assert got.loc[u, "twap_num"] == int((c[:-1] * gaps).sum())
        assert got.loc[u, "twap_den"] == int(gaps.sum())
        assert got.loc[u, "n_gaps"] == len(gaps)


def test_events_rolling_outliers_brute(events_case):
    from container_crawler_ray.pipelines.analytics import (
        events_rolling_outliers)
    d, df = events_case
    got = events_rolling_outliers(d).set_index("event_id")
    for u, g in df.groupby("user_id"):
        g = g.sort_values(["ts_us", "event_id"]).reset_index(drop=True)
        c = g.cents.to_numpy()
        for i in range(len(g)):
            w = c[max(0, i - 20):i]
            n = len(w)
            if n < 2:
                expect = 0
            else:
                s, sq = int(w.sum()), int((w * w).sum())
                expect = int((n * int(c[i]) - s) ** 2
                             > 9 * (n * sq - s * s))
            assert got.loc[int(g.iloc[i].event_id),
                           "is_outlier"] == expect


def test_dau_wau_brute(events_case):
    from container_crawler_ray.pipelines.analytics import dau_wau
    d, df = events_case
    got = dau_wau(d).set_index("day_id")
    day = df.ts_us // 86_400_000_000
    lo, hi = int(day.min()), int(day.max())
    for dd in range(lo, hi + 1):
        dau = df[day == dd].user_id.nunique()
        wau = df[(day >= dd - 6) & (day <= dd)].user_id.nunique()
        assert got.loc[dd, "dau"] == dau
        assert got.loc[dd, "wau"] == wau
        stick = dau * 1000 // wau if wau else 0
        assert got.loc[dd, "stickiness_milli"] == stick


def test_user_value_cusum_brute(events_case):
    """The prefix-scan closed form must equal the textbook sequential
    recurrence s_i = max(0, s_(i-1) + (x_i - k))."""
    from container_crawler_ray.pipelines.analytics import user_value_cusum
    d, df = events_case
    got = user_value_cusum(d).set_index("event_id")
    for u, g in df.groupby("user_id"):
        g = g.sort_values(["ts_us", "event_id"])
        s = 0
        for _, row in g.iterrows():
            s = max(0, s + int(row.cents) - 2500)
            assert got.loc[int(row.event_id), "cusum_cents"] == s
            assert got.loc[int(row.event_id), "alarm"] == int(s > 50000)


def test_ks_and_mwu_match_pairwise_brute(events_case):
    """KS and MWU numerators re-derived by naive O(n·grid) / O(n²)
    loops — exercises the tie handling (2dp cents collide heavily)."""
    d, df = events_case
    from container_crawler_ray.pipelines.analytics import (
        events_ks_test, events_mwu)
    a = sorted(df.loc[df.event_type == "click", "cents"])
    b = sorted(df.loc[df.event_type == "purchase", "cents"])
    n1, n2 = len(a), len(b)
    grid = sorted(set(a) | set(b))
    ks = max(abs(sum(1 for x in a if x <= v) * n2
                 - sum(1 for x in b if x <= v) * n1) for v in grid)
    out = events_ks_test(d).iloc[0]
    assert (int(out["n1"]), int(out["n2"])) == (n1, n2)
    assert int(out["ks_num"]) == ks
    assert int(out["ks_milli"]) == ks * 1000 // (n1 * n2)
    u1x2 = sum(2 for x in a for y in b if x > y) \
        + sum(1 for x in a for y in b if x == y)
    m = events_mwu(d).iloc[0]
    assert int(m["u1_x2"]) == u1x2
    assert int(m["u2_x2"]) == 2 * n1 * n2 - u1x2
    assert int(m["auc_milli"]) == u1x2 * 1000 // (2 * n1 * n2)


def test_user_streak_max_brute(events_case):
    """Streaks re-derived by a per-user day loop (duplicate days and
    single-event users included)."""
    d, df = events_case
    from container_crawler_ray.pipelines.analytics import user_streak_max
    out = user_streak_max(d).set_index("user_id")
    DAY = 86_400_000_000
    for u, g in df.groupby("user_id"):
        days = sorted(set(int(t) // DAY for t in g["ts_us"]))
        best = run = 1
        for i in range(1, len(days)):
            run = run + 1 if days[i] == days[i - 1] + 1 else 1
            best = max(best, run)
        assert int(out.loc[u, "n_days"]) == len(days)
        assert int(out.loc[u, "max_streak"]) == best


def test_session_funnel_strict_brute(events_case):
    from container_crawler_ray.pipelines.analytics import (
        session_funnel_strict)
    d, df = events_case
    gap = 1_800_000_000
    got = session_funnel_strict(d).set_index("user_id")
    for u, g in df.groupby("user_id"):
        g = g.sort_values("ts_us")
        ts = g.ts_us.to_numpy()
        et = g.event_type.to_numpy()
        brk = np.ones(len(ts), dtype=bool)
        brk[1:] = (ts[1:] - ts[:-1]) > gap
        sid = np.cumsum(brk) - 1
        n_funnel = 0
        for s in range(sid.max() + 1):
            m = sid == s
            st, se = ts[m], et[m]
            # exists click < view < purchase, strictly increasing ts
            ok = any(t1 < t2 < t3
                     for t1 in st[se == "click"]
                     for t2 in st[se == "view"]
                     for t3 in st[se == "purchase"])
            n_funnel += int(ok)
        assert got.loc[u, "n_sessions"] == sid.max() + 1
        assert got.loc[u, "n_funnel_sessions"] == n_funnel


def _make_lineitem_dir(tmp_path, n_orders=60, seed=3):
    """Tiny lineitem table with duplicate (orderkey, linenumber) rows
    (the tiebreak case), repeated partkeys inside an order (self-edge
    case) and a dense enough graph that wedges and triangles exist."""
    rng = np.random.RandomState(seed)
    rows = []
    for ok in range(n_orders):
        n_lines = rng.randint(1, 7)
        for ln in range(n_lines):
            rows.append((ok, ln, int(rng.randint(0, 18))))
        if n_lines > 2 and ok % 5 == 0:      # duplicate linenumber
            rows.append((ok, 1, int(rng.randint(0, 18))))
    ok, ln, pk = map(np.array, zip(*rows))
    tbl = pa.table({
        "l_orderkey": pa.array(ok.astype(np.int64)),
        "l_linenumber": pa.array(ln.astype(np.int64)),
        "l_partkey": pa.array(pk.astype(np.int64)),
        "l_quantity": pa.array(np.ones(len(ok))),
        "l_extendedprice": pa.array(np.ones(len(ok))),
        "l_discount": pa.array(np.zeros(len(ok)))})
    d = tmp_path / "sf_graph"
    d.mkdir()
    pq.write_table(tbl, d / "lineitem.parquet")
    # brute undirected distinct edge set under the engine's total order
    df = tbl.to_pandas().sort_values(
        ["l_orderkey", "l_linenumber", "l_partkey"])
    edges = set()
    for _, g in df.groupby("l_orderkey"):
        p = g.l_partkey.to_numpy()
        for i in range(len(p) - 1):
            a, b = int(p[i]), int(p[i + 1])
            if a != b:
                edges.add((min(a, b), max(a, b)))
    return str(d), edges


@pytest.fixture(scope="module")
def graph_case(tmp_path_factory):
    return _make_lineitem_dir(tmp_path_factory.mktemp("graphbrute"))


def _adj(edges):
    adj = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    return adj


def test_part_link_prediction_brute(graph_case):
    from container_crawler_ray.pipelines.graph import part_link_prediction
    d, edges = graph_case
    adj = _adj(edges)
    nodes = sorted(adj)
    cn = {}
    for i, a in enumerate(nodes):
        for b in nodes[i + 1:]:
            if (a, b) in edges:
                continue
            k = len(adj[a] & adj[b])
            if k:
                cn[(a, b)] = k
    want = sorted(cn.items(), key=lambda kv: (-kv[1], kv[0]))[:100]
    got = part_link_prediction(d)
    assert [((r.p1, r.p2), r.cn) for r in got.itertuples()] == want


def test_part_clustering_coeff_brute(graph_case):
    from container_crawler_ray.pipelines.graph import part_clustering_coeff
    d, edges = graph_case
    adj = _adj(edges)
    got = part_clustering_coeff(d).set_index("p_partkey")
    expect_nodes = sorted(v for v in adj if len(adj[v]) >= 2)
    assert list(got.index) == expect_nodes
    for v in expect_nodes:
        nb = sorted(adj[v])
        closed = sum(1 for i in range(len(nb)) for j in range(i + 1, len(nb))
                     if (nb[i], nb[j]) in edges)
        deg = len(nb)
        assert got.loc[v, "deg"] == deg
        assert got.loc[v, "n_closed"] == closed
        assert got.loc[v, "cc_bps"] == closed * 10000 // (deg * (deg - 1) // 2)


def test_part_neighbor_jaccard_brute(graph_case):
    from container_crawler_ray.pipelines.graph import part_neighbor_jaccard
    d, edges = graph_case
    adj = _adj(edges)
    rows = []
    for a, b in sorted(edges):
        k = len(adj[a] & adj[b])
        if k:
            rows.append(((a, b), k, len(adj[a]), len(adj[b]),
                         k * 10000 // (len(adj[a]) + len(adj[b]) - k)))
    want = sorted(rows, key=lambda r: (-r[4], r[0]))[:100]
    got = part_neighbor_jaccard(d)
    assert [((r.p1, r.p2), r.cn, r.deg_a, r.deg_b, r.jacc_bps)
            for r in got.itertuples()] == want


def test_part_assortativity_brute(graph_case):
    from container_crawler_ray.pipelines.graph import part_assortativity
    d, edges = graph_case
    adj = _adj(edges)
    xs, ys = [], []
    for a, b in edges:
        xs += [len(adj[a]), len(adj[b])]
        ys += [len(adj[b]), len(adj[a])]
    x = np.array(xs, dtype=np.float64)
    y = np.array(ys, dtype=np.float64)
    m = float(len(x))
    num = m * float((x * y).sum()) - x.sum() * y.sum()
    den = (np.sqrt(m * float((x * x).sum()) - x.sum() ** 2)
           * np.sqrt(m * float((y * y).sum()) - y.sum() ** 2))
    got = part_assortativity(d)
    assert int(got.n_edges.iloc[0]) == len(edges)
    assert int(got.m_oriented.iloc[0]) == len(x)
    assert abs(int(got.r_milli.iloc[0]) - int(np.floor(num / den * 1000))) <= 1
