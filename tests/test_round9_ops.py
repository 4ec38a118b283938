"""Ground-truth tests for the round-9 operators: numpy/pandas brute
forces of the ACF/Ljung-Box/Theil/Grubbs/Kendall-W/McNemar/Cronbach
diagnostics, an O(n²) pairwise AUC, the Brier identity, survival sums
against hand-rolled risk sets, HITS/PPR/TextRank power iterations, the
Count-Sketch construction, and the Croston fold — all on sf0.001 (or
crafted micro-fixtures) where exhaustive recomputation is cheap."""

from __future__ import annotations

import duckdb
import numpy as np
import pytest

SF_DIR = "/root/testdata/sf0.001"


def _orders_df():
    con = duckdb.connect()
    return con.execute(
        f"SELECT * FROM '{SF_DIR}/orders.parquet'"
    ).df()


def _daily_series():
    od = _orders_df()
    od["cents"] = np.round(od["o_totalprice"] * 100).astype(np.int64)
    daily = (
        od.groupby(od["o_orderdate"].dt.date)["cents"].sum().sort_index()
    )
    return daily.values.astype(np.float64) / 1e9


def test_acf_matches_numpy(spark):
    from us_flight_bigdata_dashboard_spark.operators.evaluation import q_acf_lags

    v = _daily_series()
    n = len(v)
    vbar = v.sum() / n  # quantization below test tolerance
    den = ((v - vbar) ** 2).sum()
    rows = {r["lag"]: r for r in q_acf_lags(spark, SF_DIR).collect()}
    assert set(rows) == set(range(1, 8))
    for k in range(1, 8):
        num = ((v[k:] - vbar) * (v[:-k] - vbar)).sum()
        assert rows[k]["n"] == n
        assert rows[k]["acf"] == pytest.approx(num / den, abs=1e-5)


def test_ljung_box_consistent_with_acf(spark):
    from us_flight_bigdata_dashboard_spark.operators.evaluation import (
        q_acf_lags,
        q_ljung_box_q,
    )

    acf = {r["lag"]: r["acf"] for r in q_acf_lags(spark, SF_DIR).collect()}
    (row,) = q_ljung_box_q(spark, SF_DIR).collect()
    n, m = row["n"], row["m"]
    assert m == 7
    expect = n * (n + 2.0) * sum(acf[k] ** 2 / (n - k) for k in range(1, 8))
    # fsum floor-quantizes each of the 7 addends at 1e-12, and the sum is
    # then scaled by n(n+2) — the bound is 7e-12 * n * (n+2)
    assert row["q_stat"] == pytest.approx(expect, abs=7e-12 * n * (n + 2) + 1e-9)


def test_theils_u_matches_numpy(spark):
    from us_flight_bigdata_dashboard_spark.operators.evaluation import (
        q_theils_u_forecast,
    )

    od = _orders_df()
    od["cents"] = np.round(od["o_totalprice"] * 100).astype(np.int64)
    ym = od["o_orderdate"].dt.year * 12 + od["o_orderdate"].dt.month
    v = od.groupby(ym)["cents"].sum().sort_index().values / 1e9
    e = v[1:] - v[:-1]
    npairs = len(e)
    u1 = np.sqrt((e**2).sum() / npairs) / (
        np.sqrt((v[1:] ** 2).sum() / npairs) + np.sqrt((v[:-1] ** 2).sum() / npairs)
    )
    (row,) = q_theils_u_forecast(spark, SF_DIR).collect()
    assert row["n_pairs"] == npairs
    assert row["u1"] == pytest.approx(u1, rel=1e-6)


def test_grubbs_matches_numpy(spark):
    from us_flight_bigdata_dashboard_spark.operators.evaluation import (
        q_grubbs_statistic,
    )

    con = duckdb.connect()
    df = con.execute(f"""
        SELECT r_name, YEAR(o_orderdate)*12+MONTH(o_orderdate) AS ym,
               SUM(CAST(round(o_totalprice*100,0) AS BIGINT)) AS y
        FROM '{SF_DIR}/orders.parquet'
        JOIN '{SF_DIR}/customer.parquet' ON o_custkey=c_custkey
        JOIN '{SF_DIR}/nation.parquet' ON c_nationkey=n_nationkey
        JOIN '{SF_DIR}/region.parquet' ON n_regionkey=r_regionkey
        GROUP BY 1,2
    """).df()
    rows = {r["r_name"]: r for r in q_grubbs_statistic(spark, SF_DIR).collect()}
    for rn, grp in df.groupby("r_name"):
        v = grp["y"].values.astype(np.float64) / 1e9
        sigma = np.sqrt((v**2).mean() - v.mean() ** 2)
        g = np.abs(v - v.mean()).max() / sigma
        assert rows[rn]["n_months"] == len(v)
        assert rows[rn]["g_stat"] == pytest.approx(g, rel=1e-5)


def test_kendalls_w_matches_pandas(spark):
    from us_flight_bigdata_dashboard_spark.operators.evaluation import q_kendalls_w

    con = duckdb.connect()
    df = con.execute(f"""
        SELECT c_nationkey AS nk, YEAR(o_orderdate)*12+MONTH(o_orderdate) AS ym,
               SUM(CAST(round(o_totalprice*100,0) AS BIGINT)) AS y
        FROM '{SF_DIR}/orders.parquet'
        JOIN '{SF_DIR}/customer.parquet' ON o_custkey=c_custkey
        WHERE YEAR(o_orderdate)*12+MONTH(o_orderdate) BETWEEN {1995*12+1} AND {1996*12+12}
        GROUP BY 1,2
    """).df()
    nations = sorted(
        duckdb.connect()
        .execute(f"SELECT n_nationkey FROM '{SF_DIR}/nation.parquet'")
        .df()["n_nationkey"]
    )
    months = list(range(1995 * 12 + 1, 1996 * 12 + 12 + 1))
    lut = {(r.nk, r.ym): r.y for r in df.itertuples()}
    r_sum = {nk: 0 for nk in nations}
    for ym in months:
        vals = sorted(
            ((lut.get((nk, ym), 0), nk) for nk in nations),
            key=lambda t: (-t[0], t[1]),
        )
        for rank, (_, nk) in enumerate(vals, start=1):
            r_sum[nk] += rank
    m, n = len(months), len(nations)
    mean_r = m * (n + 1) / 2
    s = sum((r - mean_r) ** 2 for r in r_sum.values())
    w = 12.0 * s / (m * m * (n**3 - n))
    (row,) = q_kendalls_w(spark, SF_DIR).collect()
    assert row["m_judges"] == m and row["n_items"] == n
    assert row["s"] == s
    assert row["w_stat"] == pytest.approx(w, rel=1e-12)


def test_mcnemar_matches_pandas(spark):
    from us_flight_bigdata_dashboard_spark.operators.evaluation import (
        q_mcnemar_paired,
    )

    od = _orders_df()
    od["big"] = od["o_totalprice"] > 150000.0
    od["pre"] = od["o_orderdate"] < np.datetime64("1998-01-01")
    g = od.groupby("o_custkey").apply(
        lambda x: (bool((x.big & x.pre).any()), bool((x.big & ~x.pre).any())),
        include_groups=False,
    )
    b = sum(1 for h1, h2 in g if h1 and not h2)
    c = sum(1 for h1, h2 in g if not h1 and h2)
    (row,) = q_mcnemar_paired(spark, SF_DIR).collect()
    assert (row["b"], row["c"]) == (b, c)
    assert row["chi2"] == pytest.approx((b - c) ** 2 / (b + c), rel=1e-12)


def test_cronbach_matches_numpy(spark):
    from us_flight_bigdata_dashboard_spark.operators.evaluation import (
        q_cronbachs_alpha,
    )

    od = _orders_df()
    i1 = od["o_orderpriority"].isin(["1-URGENT", "2-HIGH"]).astype(int)
    i2 = (od["o_totalprice"] > 150000.0).astype(int)
    i3 = (od["o_orderstatus"] == "F").astype(int)
    x = i1 + i2 + i3
    var = lambda s: s.var(ddof=0)
    alpha = 1.5 * (1 - (var(i1) + var(i2) + var(i3)) / var(x))
    (row,) = q_cronbachs_alpha(spark, SF_DIR).collect()
    assert row["n"] == len(od)
    assert row["alpha"] == pytest.approx(alpha, rel=1e-9)


def test_roc_auc_matches_pairwise(spark):
    from us_flight_bigdata_dashboard_spark.operators.evaluation import q_roc_auc_exact

    od = _orders_df()
    pos = od[od["o_orderpriority"] == "1-URGENT"]["o_totalprice"].values
    neg = od[od["o_orderpriority"] != "1-URGENT"]["o_totalprice"].values
    gt = (pos[:, None] > neg[None, :]).sum()
    eq = (pos[:, None] == neg[None, :]).sum()
    auc = (gt + 0.5 * eq) / (len(pos) * len(neg))
    (row,) = q_roc_auc_exact(spark, SF_DIR).collect()
    assert (row["n_pos"], row["n_neg"]) == (len(pos), len(neg))
    assert row["auc"] == pytest.approx(auc, rel=1e-12)


def test_brier_identity_and_brute_force(spark):
    from us_flight_bigdata_dashboard_spark.operators.evaluation import (
        q_brier_decomposition,
    )

    od = _orders_df()
    y = (od["o_orderpriority"] == "1-URGENT").astype(float).values
    v = od["o_totalprice"].values
    mn, mx = v.min(), v.max()
    b = np.minimum(9, np.floor((v - mn) * 10 / (mx - mn))).astype(int)
    p = (b + 0.5) / 10.0
    brier = ((p - y) ** 2).mean()
    (row,) = q_brier_decomposition(spark, SF_DIR).collect()
    assert row["brier"] == pytest.approx(
        row["reliability"] - row["resolution"] + row["uncertainty"], rel=1e-12
    )
    assert row["brier"] == pytest.approx(brier, abs=1e-9)


def _lifetimes():
    con = duckdb.connect()
    df = con.execute(f"""
        SELECT user_id,
               CAST(floor(MIN(epoch(CAST(ts AS TIMESTAMP)))) AS BIGINT) AS f,
               CAST(floor(MAX(epoch(CAST(ts AS TIMESTAMP)))) AS BIGINT) AS l
        FROM '{SF_DIR}/events.parquet' GROUP BY 1
    """).df()
    mx = df["l"].max()
    t = (df["l"] - df["f"]) // 3600
    churned = (df["l"] < mx - 86400).astype(int)
    return t.values, churned.values, df["user_id"].values


def test_nelson_aalen_matches_brute_force(spark):
    from us_flight_bigdata_dashboard_spark.operators.evaluation import (
        q_survival_nelson_aalen,
    )

    t, churned, _ = _lifetimes()
    times = sorted(set(t))
    rows = q_survival_nelson_aalen(spark, SF_DIR).collect()
    got = {r["t_hours"]: r for r in rows}
    cum = 0.0
    for ti in times:
        n_risk = int((t >= ti).sum())
        d = int(churned[t == ti].sum())
        if d == 0:
            continue
        cum += d / n_risk
        assert got[ti]["n_risk"] == n_risk
        assert got[ti]["n_events"] == d
        assert got[ti]["cum_hazard"] == pytest.approx(cum, abs=1e-9)


def test_logrank_matches_brute_force(spark):
    from us_flight_bigdata_dashboard_spark.operators.evaluation import (
        q_survival_logrank,
    )

    t, churned, uid = _lifetimes()
    arm = uid % 2
    times = sorted(set(t))
    o1 = e1 = v = 0.0
    n_times = 0
    for ti in times:
        at = t >= ti
        n, n1 = int(at.sum()), int((at & (arm == 1)).sum())
        here = t == ti
        d = int(churned[here].sum())
        d1 = int(churned[here & (arm == 1)].sum())
        if d == 0 or n <= 1:
            continue
        n_times += 1
        o1 += d1
        e1 += d * n1 / n
        v += d * (n1 / n) * (1 - n1 / n) * (n - d) / (n - 1)
    (row,) = q_survival_logrank(spark, SF_DIR).collect()
    assert row["n_times"] == n_times and row["o1"] == o1
    assert row["e1"] == pytest.approx(e1, abs=1e-9)
    assert row["chi2"] == pytest.approx((o1 - e1) ** 2 / v, rel=1e-6)


def _purchase_pairs():
    con = duckdb.connect()
    return con.execute(f"""
        SELECT DISTINCT o_custkey AS c, l_suppkey AS s
        FROM '{SF_DIR}/lineitem.parquet' JOIN '{SF_DIR}/orders.parquet'
          ON l_orderkey = o_orderkey
    """).df()


def test_hits_matches_numpy_power_iteration(spark):
    from us_flight_bigdata_dashboard_spark.operators.graph import q_graph_hits

    df = _purchase_pairs()
    cs = sorted(df["c"].unique())
    ss = sorted(df["s"].unique())
    ci = {c: i for i, c in enumerate(cs)}
    si = {s: i for i, s in enumerate(ss)}
    A = np.zeros((len(cs), len(ss)))
    for r in df.itertuples():
        A[ci[r.c], si[r.s]] = 1.0
    h = np.ones(len(cs))
    for _ in range(2):
        a = A.T @ h
        a = a / a.max()
        h = A @ a
        h = h / h.max()
    rows = q_graph_hits(spark, SF_DIR).collect()
    for r in rows:
        kind, key = r["node"].split(":")
        if r["role"] == "authority":
            assert r["score"] == pytest.approx(a[si[int(key)]], abs=1e-9)
        else:
            assert r["score"] == pytest.approx(h[ci[int(key)]], abs=1e-9)


def test_ppr_matches_numpy(spark):
    from us_flight_bigdata_dashboard_spark.operators.graph import q_graph_ppr_seeded

    df = _purchase_pairs()
    nodes = sorted(
        {c * 2 for c in df["c"]} | {s * 2 + 1 for s in df["s"]}
    )
    ni = {n: i for i, n in enumerate(nodes)}
    deg = np.zeros(len(nodes))
    adj = []
    for r in df.itertuples():
        u, w = ni[r.c * 2], ni[r.s * 2 + 1]
        adj.append((u, w))
        adj.append((w, u))
        deg[u] += 1
        deg[w] += 1
    seeds = [ni[s * 2 + 1] for s in sorted(df["s"].unique()) if s % 10 == 1]
    restart = np.zeros(len(nodes))
    restart[seeds] = 0.15 / len(seeds)
    r_vec = np.zeros(len(nodes))
    r_vec[seeds] = 1.0 / len(seeds)
    for _ in range(3):
        nxt = restart.copy()
        for u, w in adj:
            if r_vec[u] != 0:
                nxt[w] += 0.85 * r_vec[u] / deg[u]
        r_vec = nxt
    rows = q_graph_ppr_seeded(spark, SF_DIR).collect()
    assert len(rows) == 20
    for r in rows:
        kind, key = r["node"].split(":")
        node = int(key) * 2 if kind == "c" else int(key) * 2 + 1
        assert r["rank"] == pytest.approx(r_vec[ni[node]], abs=1e-9)


def test_countsketch_matches_numpy(spark):
    from us_flight_bigdata_dashboard_spark.operators.sketches import (
        CS_COEF,
        CS_P,
        CS_W,
        q_sketch_countsketch_freq,
    )

    od = _orders_df()
    keys = od["o_custkey"].values.astype(np.int64)
    rows = q_sketch_countsketch_freq(spark, SF_DIR).collect()
    for r in rows:
        k = r["o_custkey"]
        ests = []
        for a, b, c, e in CS_COEF:
            bucket = ((keys * a + b) % CS_P) % CS_W
            sgn = (((keys * c + e) % CS_P) % 2) * 2 - 1
            kb = ((k * a + b) % CS_P) % CS_W
            ks = (((k * c + e) % CS_P) % 2) * 2 - 1
            ests.append(int(ks * sgn[bucket == kb].sum()))
        assert r["cs_est"] == sorted(ests)[2]
        assert r["exact_cnt"] == int((keys == k).sum())


def test_croston_fold_matches_python(spark):
    from us_flight_bigdata_dashboard_spark.operators.events import (
        CROSTON_ALPHA,
        q_events_croston_forecast,
    )

    con = duckdb.connect()
    df = con.execute(f"""
        SELECT l_partkey AS pk, CAST(l_shipdate AS DATE) AS day,
               SUM(CAST(round(l_quantity,0) AS BIGINT)) AS z
        FROM '{SF_DIR}/lineitem.parquet' GROUP BY 1,2 ORDER BY 1,2
    """).df()
    rows = q_events_croston_forecast(spark, SF_DIR).collect()
    assert len(rows) == 20
    for r in rows[:5]:
        grp = df[df["pk"] == r["pk"]].sort_values("day")
        zs = grp["z"].values.astype(float)
        days = grp["day"].values
        gaps = [
            int((days[i] - days[i - 1]) / np.timedelta64(1, "D"))
            for i in range(1, len(days))
        ]
        fold = lambda vals: None if not len(vals) else __import__("functools").reduce(
            lambda acc, x: x if acc is None else acc + CROSTON_ALPHA * (x - acc),
            vals,
            None,
        )
        assert r["n_demands"] == len(zs)
        assert r["z_hat"] == pytest.approx(fold(zs), rel=1e-12)
        assert r["q_hat"] == pytest.approx(fold(gaps), rel=1e-12)


def test_hapax_matches_pandas(spark):
    from us_flight_bigdata_dashboard_spark.operators.text import q_text_hapax_ratio

    con = duckdb.connect()
    docs = con.execute(f"SELECT lang, text FROM '{SF_DIR}/documents.parquet'").df()
    rows = {r["lang"]: r for r in q_text_hapax_ratio(spark, SF_DIR).collect()}
    for lang, grp in docs.groupby("lang"):
        from collections import Counter

        cnt = Counter()
        for t in grp["text"]:
            cnt.update(w for w in t.lower().split(" ") if w)
        hapax = sum(1 for v in cnt.values() if v == 1)
        assert rows[lang]["vocab"] == len(cnt)
        assert rows[lang]["hapax"] == hapax
        assert rows[lang]["n_tokens"] == sum(cnt.values())


def test_burrows_delta_symmetric_and_bounded(spark):
    from us_flight_bigdata_dashboard_spark.operators.text import (
        q_text_burrows_delta,
    )

    rows = q_text_burrows_delta(spark, SF_DIR).collect()
    assert 0 < len(rows) <= 25
    for r in rows:
        assert r["src_a"] < r["src_b"]
        assert r["delta"] >= 0.0


def test_textrank_mass_and_order(spark):
    from us_flight_bigdata_dashboard_spark.operators.text import (
        q_text_textrank_keywords,
    )

    rows = q_text_textrank_keywords(spark, SF_DIR).collect()
    assert len(rows) == 10
    scores = [r["rank"] for r in rows]
    assert scores == sorted(scores, reverse=True)
    # ranks on a connected vocab graph stay within (0, 1)
    assert all(0.0 < s < 1.0 for s in scores)


def test_page_trend_matches_pandas(spark):
    from us_flight_bigdata_dashboard_spark.operators.evaluation import (
        q_page_trend_test,
    )

    con = duckdb.connect()
    df = con.execute(f"""
        SELECT c_nationkey AS nk, YEAR(o_orderdate)*12+MONTH(o_orderdate) AS ym,
               SUM(CAST(round(o_totalprice*100,0) AS BIGINT)) AS y
        FROM '{SF_DIR}/orders.parquet'
        JOIN '{SF_DIR}/customer.parquet' ON o_custkey=c_custkey
        WHERE YEAR(o_orderdate)*12+MONTH(o_orderdate) BETWEEN {1995*12+1} AND {1996*12+12}
        GROUP BY 1,2
    """).df()
    nations = sorted(
        duckdb.connect()
        .execute(f"SELECT n_nationkey FROM '{SF_DIR}/nation.parquet'")
        .df()["n_nationkey"]
    )
    months = list(range(1995 * 12 + 1, 1996 * 12 + 12 + 1))
    lut = {(r.nk, r.ym): r.y for r in df.itertuples()}
    r_sum = {nk: 0 for nk in nations}
    for ym in months:
        vals = sorted(
            ((lut.get((nk, ym), 0), nk) for nk in nations),
            key=lambda t: (-t[0], t[1]),
        )
        for rank, (_, nk) in enumerate(vals, start=1):
            r_sum[nk] += rank
    l_stat = sum((i + 1) * r_sum[nk] for i, nk in enumerate(nations))
    m, n = len(months), len(nations)
    e_l = m * n * (n + 1) ** 2 / 4
    var_l = m * n * n * (n + 1) * (n * n - 1) / 144
    (row,) = q_page_trend_test(spark, SF_DIR).collect()
    assert row["l_stat"] == l_stat
    assert row["z_stat"] == pytest.approx((l_stat - e_l) / var_l**0.5, rel=1e-9)


def test_mann_kendall_matches_pandas(spark):
    from us_flight_bigdata_dashboard_spark.operators.evaluation import (
        q_mann_kendall_trend,
    )

    od = _orders_df()
    od["cents"] = np.round(od["o_totalprice"] * 100).astype(np.int64)
    ym = od["o_orderdate"].dt.year * 12 + od["o_orderdate"].dt.month
    y = od.groupby(ym)["cents"].sum().sort_index().values
    n = len(y)
    s = int(np.sign(y[None, :] - y[:, None])[np.triu_indices(n, 1)].sum())
    from collections import Counter

    ties = Counter(y.tolist())
    tie_term = sum(t * (t - 1) * (2 * t + 5) for t in ties.values())
    var_s = (n * (n - 1) * (2 * n + 5) - tie_term) / 18
    (row,) = q_mann_kendall_trend(spark, SF_DIR).collect()
    assert row["n"] == n and row["s"] == s
    assert row["var_s"] == pytest.approx(var_s, rel=1e-12)
    expect_z = (s - 1) / var_s**0.5 if s > 0 else ((s + 1) / var_s**0.5 if s < 0 else 0)
    assert row["z_stat"] == pytest.approx(expect_z, rel=1e-9)


def _region_monthly():
    con = duckdb.connect()
    return con.execute(f"""
        SELECT r_name, YEAR(o_orderdate)*12+MONTH(o_orderdate) AS x,
               SUM(CAST(round(o_totalprice*100,0) AS BIGINT)) AS cents
        FROM '{SF_DIR}/orders.parquet'
        JOIN '{SF_DIR}/customer.parquet' ON o_custkey=c_custkey
        JOIN '{SF_DIR}/nation.parquet' ON c_nationkey=n_nationkey
        JOIN '{SF_DIR}/region.parquet' ON n_regionkey=r_regionkey
        GROUP BY 1,2
    """).df()


def _ssr(x, v):
    n = len(x)
    sx, sy = x.sum(), v.sum()
    sxy, sxx, syy = (x * v).sum(), (x * x).sum(), (v * v).sum()
    return (syy - sy * sy / n) - (sxy - sx * sy / n) ** 2 / (sxx - sx * sx / n)


def test_chow_matches_numpy(spark):
    from us_flight_bigdata_dashboard_spark.operators.evaluation import q_chow_test

    df = _region_monthly()
    rows = {r["r_name"]: r for r in q_chow_test(spark, SF_DIR).collect()}
    for rn, grp in df.groupby("r_name"):
        x = grp["x"].values.astype(float)
        v = grp["cents"].values.astype(float) / 1e9
        pre = x < 1998 * 12 + 1
        ssr1, ssr2, ssrp = _ssr(x[pre], v[pre]), _ssr(x[~pre], v[~pre]), _ssr(x, v)
        n = len(x)
        f = ((ssrp - ssr1 - ssr2) / 2) / ((ssr1 + ssr2) / (n - 4))
        assert rows[rn]["n_pre"] == int(pre.sum())
        # the SSRs difference (numerator) is a small residual of large
        # moment terms, so the 1e-8 fsum quantization of the y-moments is
        # amplified by cancellation — tolerance reflects that, determinism
        # across engines is what the oracle gate checks exactly
        assert rows[rn]["f_stat"] == pytest.approx(f, rel=3e-2)


def test_regression_influence_matches_numpy(spark):
    from us_flight_bigdata_dashboard_spark.operators.evaluation import (
        q_regression_influence,
    )

    df = _region_monthly()
    cooks_all = {}
    for rn, grp in df.groupby("r_name"):
        x = grp["x"].values.astype(float)
        v = grp["cents"].values.astype(float) / 1e9
        n = len(x)
        sxx_c = (x * x).sum() - x.sum() ** 2 / n
        b = ((x * v).sum() - x.sum() * v.sum() / n) / sxx_c
        a = (v.sum() - b * x.sum()) / n
        e = v - (a + b * x)
        h = 1 / n + (x - x.mean()) ** 2 / sxx_c
        s2 = _ssr(x, v) / (n - 2)
        d = e * e * h / (2 * s2 * (1 - h) ** 2)
        for xi, di in zip(x, d):
            cooks_all[(rn, int(xi))] = di
    rows = q_regression_influence(spark, SF_DIR).collect()
    assert len(rows) == 10
    # key-based compare (quantization can swap near-tied top-10 ranks);
    # each returned cell's D must match its brute-force value, and the
    # returned set must sit inside the brute-force top-12
    top12 = {k for k, _ in sorted(cooks_all.items(), key=lambda kv: (-kv[1], kv[0]))[:12]}
    for r in rows:
        key = (r["r_name"], r["x"])
        assert key in top12
        assert r["cooks_d"] == pytest.approx(cooks_all[key], rel=3e-2)


def _write(spark, root, name, rows, schema):
    import os

    spark.createDataFrame(rows, schema).write.mode("overwrite").parquet(
        os.path.join(root, f"{name}.parquet")
    )


def test_supplier_similarity_cap_drops_hot_customer(spark, tmp_path_factory):
    """Planted hot key: customer 1 buys from 70 suppliers (> the 64 cap)
    and must contribute NO pairs; customers 2 and 3 share suppliers 1-2
    and must dominate the output with exact Jaccard on the capped graph."""
    import datetime as dt

    from us_flight_bigdata_dashboard_spark.operators.graph import (
        SUPPS_PER_CUST_CAP,
        q_graph_supplier_similarity,
    )

    assert SUPPS_PER_CUST_CAP == 64
    root = str(tmp_path_factory.mktemp("simcap"))
    ts = dt.datetime(1995, 6, 1)
    orders, lines = [], []
    # customer 1: one order touching suppliers 100..169 (70 distinct > cap)
    orders.append((1, 1, "O", 100.0, ts, "1-URGENT"))
    for s in range(100, 170):
        lines.append((1, s, 1.0, ts))
    # customers 2 and 3: both buy from suppliers 1 and 2 (and 3 only cust 3)
    orders += [(2, 2, "O", 100.0, ts, "1-URGENT"), (3, 3, "O", 100.0, ts, "1-URGENT")]
    lines += [(2, 1, 1.0, ts), (2, 2, 1.0, ts), (3, 1, 1.0, ts), (3, 2, 1.0, ts), (3, 3, 1.0, ts)]
    _write(
        spark, root, "orders", orders,
        "o_orderkey bigint, o_custkey bigint, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    )
    _write(
        spark, root, "lineitem", lines,
        "l_orderkey bigint, l_suppkey bigint, l_quantity double, l_shipdate timestamp",
    )
    rows = q_graph_supplier_similarity(spark, root).collect()
    nodes_in_pairs = {r["supp_a"] for r in rows} | {r["supp_b"] for r in rows}
    # the hot customer's suppliers (100..169) must never appear
    assert not any(s >= 100 for s in nodes_in_pairs)
    by_pair = {(r["supp_a"], r["supp_b"]): r for r in rows}
    # suppliers 1,2 share custs {2,3} -> inter=2, deg=2 each -> jaccard 1.0
    assert by_pair[(1, 2)]["jaccard"] == 1.0
    # suppliers 1,3: inter=1 (cust 3), deg 2 and 1 -> jaccard 1/2
    assert by_pair[(1, 3)]["jaccard"] == 0.5


def test_xyz_no_demand_and_classes(spark, tmp_path_factory):
    """Planted classes: a part with zero lineitems is NO_DEMAND; a part
    shipped the same quantity every month has CV=0 (X); a part with one
    spike month lands in Z."""
    import datetime as dt

    from us_flight_bigdata_dashboard_spark.operators.decision import (
        q_xyz_demand_class,
    )

    root = str(tmp_path_factory.mktemp("xyzcls"))
    parts = [(1, "B#steady"), (2, "B#spiky"), (3, "B#none")]
    _write(spark, root, "part", parts, "p_partkey bigint, p_brand string")
    lines = []
    for m in range(1, 13):
        ts = dt.datetime(1995, m, 15)
        lines.append((m, 1, 10.0, ts))          # steady: 10 every month
        lines.append((100 + m, 2, 1.0 if m < 12 else 500.0, ts))  # spike
    _write(
        spark, root, "lineitem", lines,
        "l_orderkey bigint, l_partkey bigint, l_quantity double, l_shipdate timestamp",
    )
    rows = {(r["p_brand"], r["xyz_class"]): r["n_parts"] for r in
            q_xyz_demand_class(spark, root).collect()}
    assert rows[("B#steady", "X")] == 1
    assert rows[("B#spiky", "Z")] == 1
    assert rows[("B#none", "NO_DEMAND")] == 1


def test_source_mix_temperature_invariants(spark):
    from us_flight_bigdata_dashboard_spark.operators.text import (
        MIX_TOKEN_BUDGET,
        q_source_mix_temperature,
    )

    rows = q_source_mix_temperature(spark, SF_DIR).collect()
    assert rows, "no sources"
    wsum = sum(r["mix_weight"] for r in rows)
    assert wsum == pytest.approx(1.0, abs=1e-9)
    assert sum(r["token_allocation"] for r in rows) == pytest.approx(
        MIX_TOKEN_BUDGET, rel=1e-9
    )
    # sqrt temperature flattens: the largest source's weight share must not
    # exceed its raw token share, and the smallest's must not fall below it
    tot = sum(r["n_tokens"] for r in rows)
    big, small = rows[0], rows[-1]
    assert big["mix_weight"] <= big["n_tokens"] / tot + 1e-12
    assert small["mix_weight"] >= small["n_tokens"] / tot - 1e-12
    for r in rows:
        assert r["effective_epochs"] == pytest.approx(
            r["token_allocation"] / r["n_tokens"], rel=1e-12
        )


def test_lang_purity_matches_pandas(spark):
    from collections import Counter

    from us_flight_bigdata_dashboard_spark.operators.text import (
        q_source_lang_purity,
    )

    con = duckdb.connect()
    docs = con.execute(f"SELECT source, lang FROM '{SF_DIR}/documents.parquet'").df()
    rows = {r["source"]: r for r in q_source_lang_purity(spark, SF_DIR).collect()}
    for src, grp in docs.groupby("source"):
        cnt = Counter(grp["lang"])
        n = sum(cnt.values())
        maj_lang, maj_c = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        gs = 1.0 - sum(c * c for c in cnt.values()) / (n * n)
        r = rows[src]
        assert r["n_docs"] == n and r["majority_lang"] == maj_lang
        assert r["majority_share"] == pytest.approx(maj_c / n, rel=1e-12)
        assert r["gini_simpson"] == pytest.approx(gs, rel=1e-12)


def test_tokenizer_fertility_matches_python(spark):
    import re

    from us_flight_bigdata_dashboard_spark.operators.text import (
        BPE_PATTERN,
        q_tokenizer_fertility,
    )

    con = duckdb.connect()
    docs = con.execute(f"SELECT lang, text FROM '{SF_DIR}/documents.parquet'").df()
    rows = {r["lang"]: r for r in q_tokenizer_fertility(spark, SF_DIR).collect()}
    pat = re.compile(BPE_PATTERN)
    for lang, grp in docs.groupby("lang"):
        words = sum(len([w for w in t.lower().split(" ") if w]) for t in grp["text"])
        bpe = sum(len(pat.findall(t)) for t in grp["text"])
        r = rows[lang]
        assert (r["n_words"], r["n_bpe_tokens"]) == (words, bpe)
        assert r["fertility"] == pytest.approx(bpe / words, rel=1e-12)


def test_abc_xyz_grid_consistent_with_axes(spark):
    from us_flight_bigdata_dashboard_spark.operators.decision import (
        q_abc_pareto_class,
        q_abc_xyz_grid,
        q_xyz_demand_class,
    )

    grid = q_abc_xyz_grid(spark, SF_DIR).collect()
    n_parts_grid = sum(r["n_parts"] for r in grid)
    # every part classified exactly once, and the grid marginals must agree
    # with the single-axis views
    abc = {r["abc_class"]: r["n_parts"] for r in q_abc_pareto_class(spark, SF_DIR).collect()}
    xyz = {}
    for r in q_xyz_demand_class(spark, SF_DIR).collect():
        xyz[r["xyz_class"]] = xyz.get(r["xyz_class"], 0) + r["n_parts"]
    assert n_parts_grid == sum(xyz.values())
    from collections import defaultdict

    marg_abc, marg_xyz = defaultdict(int), defaultdict(int)
    for r in grid:
        marg_abc[r["abc_class"]] += r["n_parts"]
        marg_xyz[r["xyz_class"]] += r["n_parts"]
    assert dict(marg_abc) == abc
    assert dict(marg_xyz) == xyz
    assert sum(r["revenue_share"] for r in grid) == pytest.approx(1.0, abs=1e-9)


def test_otif_rate_matches_pandas(spark):
    from us_flight_bigdata_dashboard_spark.operators.decision import (
        OTIF_DAYS,
        q_otif_rate,
    )

    con = duckdb.connect()
    df = con.execute(f"""
        SELECT YEAR(o_orderdate)*12+MONTH(o_orderdate) AS ym,
               MAX(CAST(l_shipdate AS DATE)) - CAST(ANY_VALUE(o_orderdate) AS DATE) AS lag_days,
               MAX(CASE WHEN l_returnflag='R' THEN 1 ELSE 0 END) AS ret
        FROM '{SF_DIR}/lineitem.parquet' JOIN '{SF_DIR}/orders.parquet'
          ON l_orderkey = o_orderkey
        GROUP BY o_orderkey, ym
    """).df()
    rows = {r["ym"]: r for r in q_otif_rate(spark, SF_DIR).collect()}
    for ym, grp in df.groupby("ym"):
        on_time = grp["lag_days"] <= OTIF_DAYS
        in_full = grp["ret"] == 0
        r = rows[ym]
        assert r["n_orders"] == len(grp)
        assert r["n_otif"] == int((on_time & in_full).sum())
        assert r["n_late"] == int((~on_time).sum())
        assert r["n_returned"] == int((~in_full).sum())
