"""Ground-truth tests for the round-11 additions: a pandas recomputation
of the real-horizon stream-stream interval join (drop/absorb semantics on
BOTH join sides, including cross-batch state-survival straddle pairs), plus brute forces for the round-11 operator wave — on
sf0.001 where exhaustive recomputation is cheap."""

from __future__ import annotations

import math

import duckdb
import numpy as np
import pandas as pd
import pytest

SF_DIR = "/root/testdata/sf0.001"


def _df(table: str):
    con = duckdb.connect()
    return con.execute(f"SELECT * FROM '{SF_DIR}/{table}.parquet'").df()


# ---------------------------------------------------------------------------
# streaming_interval_join_late_replay — drop/absorb semantics on a
# stream-stream join under the real watermark horizon
# ---------------------------------------------------------------------------


def test_interval_join_late_replay_semantics(spark):
    from us_flight_bigdata_dashboard_spark.streaming.replay import (
        _IJL_ANCIENT_H,
        _IJL_LATE_H,
        _IJL_LOOKBACK_H,
        q_streaming_interval_join_late_replay,
    )

    rows = q_streaming_interval_join_late_replay(spark, SF_DIR).collect()
    got = {(r["click_event_id"], r["view_event_id"]) for r in rows}
    assert len(got) == len(rows)  # inner join emits each pair exactly once

    ev = _df("events").dropna(subset=["ts"])
    tmin = ev["ts"].min()
    gm = ev["ts"].max()
    cutoff = tmin + np.timedelta64(_IJL_ANCIENT_H, "h")
    kept = ev[~((ev["ts"] < cutoff) & (ev["event_id"] % 2 == 0))]
    clicks = kept[kept["event_type"] == "click"]
    views = kept[kept["event_type"] == "view"]
    expect = set()
    for _, c in clicks.iterrows():
        lo = c["ts"] - np.timedelta64(_IJL_LOOKBACK_H, "h")
        m = views[
            (views["user_id"] == c["user_id"])
            & (views["ts"] <= c["ts"])
            & (views["ts"] >= lo)
        ]
        for vid in m["event_id"]:
            expect.add((c["event_id"], vid))
    # (1) the emitted set IS the kept-x-kept batch interval join
    assert got == expect
    # (2) drop evidence: no pair touches the beyond-horizon slice
    dropped = set(
        ev.loc[(ev["ts"] < cutoff) & (ev["event_id"] % 2 == 0), "event_id"]
    )
    assert all(c not in dropped and v not in dropped for c, v in got)
    # (3) absorb evidence: pairs involving the late-but-inside slice
    # (last _LATE_RECENT_H hours, delivered after everything else) exist —
    # their partners' join state survived to meet them
    recent_cut = gm - np.timedelta64(_IJL_LATE_H, "h")
    recent_ids = set(ev.loc[ev["ts"] >= recent_cut, "event_id"])
    assert any(c in recent_ids or v in recent_ids for c, v in got)
    # (3b) the strongest form: STRADDLING pairs — a late-delivered click
    # matched an on-time view from an earlier micro-batch, so that view's
    # join state provably survived until the late batch arrived
    assert any(c in recent_ids and v not in recent_ids for c, v in got)


# ---------------------------------------------------------------------------
# kuiper_two_sample — ECDF brute force
# ---------------------------------------------------------------------------


def test_kuiper_bruteforce(spark):
    from us_flight_bigdata_dashboard_spark.operators.statistics import (
        q_kuiper_two_sample,
    )

    od = _df("orders")
    g1 = od.loc[od["o_orderpriority"] == "1-URGENT", "o_totalprice"].values
    g2 = od.loc[od["o_orderpriority"] != "1-URGENT", "o_totalprice"].values
    n1, n2 = len(g1), len(g2)
    vals = np.unique(od["o_totalprice"].values)
    dplus = dminus = 0
    for v in vals:
        a1 = int((g1 <= v).sum())
        a2 = int((g2 <= v).sum())
        dplus = max(dplus, a1 * n2 - a2 * n1)
        dminus = max(dminus, a2 * n1 - a1 * n2)
    (row,) = q_kuiper_two_sample(spark, SF_DIR).collect()
    assert (row["n1"], row["n2"]) == (n1, n2)
    assert row["dplus_num"] == dplus
    assert row["dminus_num"] == dminus
    assert row["v_stat"] == pytest.approx((dplus + dminus) / (n1 * n2), rel=1e-12)


# ---------------------------------------------------------------------------
# wasserstein_two_sample — ECDF-integral brute force
# ---------------------------------------------------------------------------


def test_wasserstein_bruteforce(spark):
    from us_flight_bigdata_dashboard_spark.operators.statistics import (
        q_wasserstein_two_sample,
    )

    od = _df("orders")
    g1 = od.loc[od["o_orderpriority"] == "1-URGENT", "o_totalprice"].values
    g2 = od.loc[od["o_orderpriority"] != "1-URGENT", "o_totalprice"].values
    n1, n2 = len(g1), len(g2)
    vals = np.unique(od["o_totalprice"].values)
    cents = np.round(vals * 100).astype(np.int64)
    num = 0
    for k in range(len(vals) - 1):
        a1 = int((g1 <= vals[k]).sum())
        a2 = int((g2 <= vals[k]).sum())
        num += abs(a1 * n2 - a2 * n1) * int(cents[k + 1] - cents[k])
    (row,) = q_wasserstein_two_sample(spark, SF_DIR).collect()
    assert row["w1_distance"] == pytest.approx(num / (n1 * n2 * 100.0), rel=1e-12)


# ---------------------------------------------------------------------------
# qq_shift_deciles — exact type-1 quantile brute force
# ---------------------------------------------------------------------------


def test_qq_shift_bruteforce(spark):
    from us_flight_bigdata_dashboard_spark.operators.statistics import (
        q_qq_shift_deciles,
    )

    od = _df("orders")
    c1 = np.sort(
        np.round(
            od.loc[od["o_orderpriority"] == "1-URGENT", "o_totalprice"].values * 100
        ).astype(np.int64)
    )
    c2 = np.sort(
        np.round(
            od.loc[od["o_orderpriority"] != "1-URGENT", "o_totalprice"].values * 100
        ).astype(np.int64)
    )

    def q_exact(arr, d):
        n = len(arr)
        k = -(-d * n // 10)  # ceil(d*n/10)
        return int(arr[k - 1])

    rows = {r["decile"]: r for r in q_qq_shift_deciles(spark, SF_DIR).collect()}
    for d in range(1, 10):
        assert rows[d]["q_urgent_cents"] == q_exact(c1, d)
        assert rows[d]["q_rest_cents"] == q_exact(c2, d)
        assert rows[d]["shift_cents"] == q_exact(c1, d) - q_exact(c2, d)


# ---------------------------------------------------------------------------
# pettitt_changepoint / cox_stuart_trend / bartels_rank_vn — daily-series
# brute forces
# ---------------------------------------------------------------------------


def _daily_counts():
    ev = _df("events").dropna(subset=["ts"])
    return ev.groupby(ev["ts"].dt.date).size().sort_index()


def test_pettitt_bruteforce(spark):
    from us_flight_bigdata_dashboard_spark.operators.events import (
        q_pettitt_changepoint,
    )

    daily = _daily_counts()
    y = daily.values
    n = len(y)
    r = pd.Series(y).rank(method="average").values
    dr = (2 * r).astype(np.int64)
    ks = []
    for t in range(1, n):
        u = int(dr[:t].sum()) - t * (n + 1)
        ks.append((abs(u), t))
    k_stat = max(a for a, _ in ks)
    first_t = min(t for a, t in ks if a == k_stat)
    (row,) = q_pettitt_changepoint(spark, SF_DIR).collect()
    assert row["n_days"] == n
    assert row["k_stat"] == k_stat
    assert row["changepoint_day"] == daily.index[first_t - 1]
    ratio = (6.0 * k_stat * k_stat) / (math.log(40.0) * (n**3 + n**2))
    assert row["k_crit_ratio"] == pytest.approx(ratio, rel=1e-12)
    # the ratio test IS the p <= 0.05 test: p = 2 exp(-6K^2/(n^3+n^2))
    p = 2.0 * math.exp(-6.0 * k_stat**2 / (n**3 + n**2))
    assert (row["significant_5pct"] == 1) == (p <= 0.05)


def test_cox_stuart_bruteforce(spark):
    from us_flight_bigdata_dashboard_spark.operators.events import (
        q_cox_stuart_trend,
    )

    y = _daily_counts().values
    n = len(y)
    c = -(-n // 2)  # ceil
    plus = minus = 0
    for i in range(n - c):
        if y[i + c] > y[i]:
            plus += 1
        elif y[i + c] < y[i]:
            minus += 1
    (row,) = q_cox_stuart_trend(spark, SF_DIR).collect()
    assert row["n_days"] == n
    assert (row["n_plus"], row["n_minus"]) == (plus, minus)
    m = plus + minus
    if m > 0:
        z = (abs(2.0 * plus - m) - 1.0) / math.sqrt(m)
        assert row["z_stat"] == pytest.approx(z, rel=1e-12)


def test_bartels_bruteforce(spark):
    from us_flight_bigdata_dashboard_spark.operators.events import (
        q_bartels_rank_vn,
    )

    y = _daily_counts().values
    n = len(y)
    r = pd.Series(y).rank(method="average").values
    dr = (2 * r).astype(np.int64)
    num4 = int(((dr[:-1] - dr[1:]) ** 2).sum())
    den4 = int(((dr - (n + 1)) ** 2).sum())
    (row,) = q_bartels_rank_vn(spark, SF_DIR).collect()
    assert row["n_days"] == n
    assert (row["num4"], row["den4"]) == (num4, den4)
    if den4:
        rvn = num4 / den4
        assert row["rvn_stat"] == pytest.approx(rvn, rel=1e-12)
        var = (
            4.0 * (n - 2) * (5.0 * n * n - 2.0 * n - 9.0)
            / (5.0 * n * (n + 1.0) * (n - 1.0) * (n - 1.0))
        )
        assert row["z_stat"] == pytest.approx(
            (rvn - 2.0) / math.sqrt(var), rel=1e-12
        )


# ---------------------------------------------------------------------------
# events_hurst_rs — R/S brute force
# ---------------------------------------------------------------------------


def test_hurst_rs_bruteforce(spark):
    from us_flight_bigdata_dashboard_spark.operators.events import (
        HURST_BLOCKS,
        q_events_hurst_rs,
    )

    ev = _df("events").dropna(subset=["ts"])
    h = ev["ts"].values.astype("datetime64[s]").astype("int64") // 3600
    h0, h1 = h.min(), h.max()
    x = np.zeros(h1 - h0 + 1, dtype=np.int64)
    for v in h:
        x[v - h0] += 1
    (row,) = q_events_hurst_rs(spark, SF_DIR).collect()
    rs_means = {}
    for m in HURST_BLOCKS:
        vals = []
        for b in range(len(x) // m):
            blk = x[b * m : (b + 1) * m]
            s = int(blk.sum())
            s2 = int((blk.astype(object) ** 2).sum())
            if s2 * m <= s * s:
                continue
            pref = np.cumsum(blk)
            mw = m * pref - np.arange(1, m + 1) * s
            rr = (max(mw.max(), 0) - min(mw.min(), 0)) / m
            sd = math.sqrt((s2 - s * s / m) / m)
            vals.append(rr / sd)
        rs_means[m] = sum(vals) / len(vals)
        assert row[f"rs_{m}"] == pytest.approx(rs_means[m], rel=1e-8)
    lx = [math.log(m) for m in HURST_BLOCKS]
    ly = [math.log(rs_means[m]) for m in HURST_BLOCKS]
    mx = sum(lx) / len(lx)
    my = sum(ly) / len(ly)
    slope = sum((a - mx) * (b - my) for a, b in zip(lx, ly)) / sum(
        (a - mx) ** 2 for a in lx
    )
    # identity check: with dyadic m the OLS slope equals log2(z)/10
    z = (rs_means[128] / rs_means[16]) ** 3 * (rs_means[64] / rs_means[32])
    assert slope == pytest.approx(math.log2(z) / 10, rel=1e-12)
    # the engine computes log2 by 24-bit square-and-compare (truncated),
    # so compare at the truncation tolerance
    assert row["hurst_exponent"] == pytest.approx(slope, abs=1e-7)
    assert 0.0 < row["hurst_exponent"] < 1.0


# ---------------------------------------------------------------------------
# odds_ratio_binning — pandas binning brute force
# ---------------------------------------------------------------------------


def test_odds_ratio_binning_bruteforce(spark):
    from us_flight_bigdata_dashboard_spark.operators.evaluation import (
        ORB_BINS,
        q_odds_ratio_binning,
    )

    od = _df("orders")
    per_v = (
        od.assign(good=(od["o_orderstatus"] == "F").astype(int))
        .groupby("o_totalprice")
        .agg(g=("good", "sum"), n=("good", "size"))
        .sort_index()
    )
    per_v["b"] = per_v["n"] - per_v["g"]
    t = (per_v["g"] + per_v["b"]).cumsum().shift(1, fill_value=0)
    n = int((per_v["g"] + per_v["b"]).sum())
    per_v["bin"] = (ORB_BINS * t // n).astype(int)
    gt, bt = int(per_v["g"].sum()), int(per_v["b"].sum())
    rows = {r["bin"]: r for r in q_odds_ratio_binning(spark, SF_DIR).collect()}
    agg = per_v.groupby("bin")[["g", "b"]].sum()
    assert set(rows) == set(agg.index)
    for bin_, r in agg.iterrows():
        got = rows[bin_]
        g, b = int(r["g"]), int(r["b"])
        assert (got["n_good"], got["n_bad"]) == (g, b)
        if g > 0 and b > 0:
            orat = (g * bt) / (b * gt)
            assert got["odds_ratio"] == pytest.approx(orat, rel=1e-12)
            # the odds ratio IS exp(WOE) — the ln-free equivalence
            assert math.log(got["odds_ratio"]) == pytest.approx(
                math.log((g / gt) / (b / bt)), rel=1e-9
            )
        else:
            assert got["odds_ratio"] is None
        assert got["lift"] == pytest.approx(g * n / ((g + b) * gt), rel=1e-12)
        e_g = (g + b) * gt / n
        e_b = (g + b) * bt / n
        chi2 = (g - e_g) ** 2 / e_g + (b - e_b) ** 2 / e_b
        assert got["chi2_contrib"] == pytest.approx(chi2, rel=1e-9)


# ---------------------------------------------------------------------------
# propensity_smd_balance — pandas moments brute force
# ---------------------------------------------------------------------------


def test_smd_balance_bruteforce(spark):
    from us_flight_bigdata_dashboard_spark.operators.evaluation import (
        SMD_SEGMENT,
        q_propensity_smd_balance,
    )

    cust = _df("customer")
    od = _df("orders")
    per = od.groupby("o_custkey").agg(
        n_orders=("o_orderkey", "size"),
        spend_cents=("o_totalprice", lambda s: int(np.round(s * 100).sum())),
    )
    base = cust.merge(per, left_on="c_custkey", right_index=True, how="left")
    base["n_orders"] = base["n_orders"].fillna(0).astype(np.int64)
    base["spend_cents"] = base["spend_cents"].fillna(0).astype(np.int64)
    base["bal_cents"] = np.round(base["c_acctbal"] * 100).astype(np.int64)
    base["treat"] = (base["c_mktsegment"] == SMD_SEGMENT).astype(int)
    rows = {r["covariate"]: r for r in q_propensity_smd_balance(spark, SF_DIR).collect()}
    for cov in ("bal_cents", "n_orders", "spend_cents"):
        t = base.loc[base["treat"] == 1, cov].astype(float)
        c = base.loc[base["treat"] == 0, cov].astype(float)
        smd = (t.mean() - c.mean()) / math.sqrt((t.var(ddof=1) + c.var(ddof=1)) / 2)
        got = rows[cov]
        assert got["mean_treat"] == pytest.approx(t.mean(), rel=1e-9)
        assert got["smd"] == pytest.approx(smd, rel=1e-9)


# ---------------------------------------------------------------------------
# queueing_mm1_metrics — closed-form recompute
# ---------------------------------------------------------------------------


def test_mm1_bruteforce(spark):
    from us_flight_bigdata_dashboard_spark.operators.decision import (
        MM1_DAYS,
        MM1_MU_PER_DAY,
        MM1_YEAR,
        q_queueing_mm1_metrics,
    )

    li = _df("lineitem")
    jobs = (
        li[li["l_shipdate"].dt.year == MM1_YEAR]
        .groupby("l_suppkey")
        .size()
        .sort_values(ascending=False)
    )
    rows = q_queueing_mm1_metrics(spark, SF_DIR).collect()
    for r in rows:
        n = int(jobs[r["suppkey"]])
        lam = n / MM1_DAYS
        rho = lam / MM1_MU_PER_DAY
        assert r["n_jobs"] == n
        assert r["rho"] == pytest.approx(rho, rel=1e-12)
        if rho < 1:
            lq = rho * rho / (1 - rho)
            assert r["lq_jobs"] == pytest.approx(lq, rel=1e-12)
            assert r["wq_days"] == pytest.approx(lq / lam, rel=1e-12)
        else:
            assert r["lq_jobs"] is None
    # ranking is by rho desc == n_jobs desc
    got_order = [r["n_jobs"] for r in rows]
    assert got_order == sorted(got_order, reverse=True)


# ---------------------------------------------------------------------------
# wagner_whitin_lot_sizing — classic O(T^2) DP brute force
# ---------------------------------------------------------------------------


def test_wagner_whitin_bruteforce(spark):
    from us_flight_bigdata_dashboard_spark.operators.decision import (
        WW_HOLD_CENTS,
        WW_SETUP_CENTS,
        WW_T,
        WW_YEAR,
        q_wagner_whitin_lot_sizing,
    )

    li = _df("lineitem")
    mo = (
        li[li["l_shipdate"].dt.year == WW_YEAR]
        .groupby(li["l_shipdate"].dt.month)["l_quantity"]
        .sum()
        .astype(int)
    )
    d = [int(mo.get(t, 0)) for t in range(1, WW_T + 1)]
    f = [0] + [None] * WW_T
    for t in range(1, WW_T + 1):
        best = None
        for j in range(1, t + 1):
            c = WW_SETUP_CENTS + WW_HOLD_CENTS * sum(
                (i - j) * d[i - 1] for i in range(j, t + 1)
            )
            cand = f[j - 1] + c
            best = cand if best is None else min(best, cand)
        f[t] = best
    (row,) = q_wagner_whitin_lot_sizing(spark, SF_DIR).collect()
    assert row["total_demand_qty"] == sum(d)
    assert row["optimal_cost_cents"] == f[WW_T]


# ---------------------------------------------------------------------------
# graph_adamic_adar — pandas pair brute force
# ---------------------------------------------------------------------------


def test_adamic_adar_bruteforce(spark):
    from us_flight_bigdata_dashboard_spark.operators.graph import (
        AA_FP,
        RA_TOP,
        SUPPS_PER_CUST_CAP,
        q_graph_adamic_adar,
    )

    li = _df("lineitem")[["l_orderkey", "l_suppkey"]]
    od = _df("orders")[["o_orderkey", "o_custkey"]]
    cs = li.merge(od, left_on="l_orderkey", right_on="o_orderkey")[
        ["o_custkey", "l_suppkey"]
    ].drop_duplicates()
    scores: dict = {}
    commons: dict = {}
    for _, grp in cs.groupby("o_custkey"):
        supps = sorted(grp["l_suppkey"])
        k = len(supps)
        if k < 2 or k > SUPPS_PER_CUST_CAP:
            continue
        w = math.floor(AA_FP / math.log(k))
        for ii in range(k):
            for jj in range(ii + 1, k):
                key = (supps[ii], supps[jj])
                scores[key] = scores.get(key, 0) + w
                commons[key] = commons.get(key, 0) + 1
    top = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:RA_TOP]
    rows = q_graph_adamic_adar(spark, SF_DIR).collect()
    assert len(rows) == min(RA_TOP, len(top))
    for r, (key, fp) in zip(rows, top):
        assert (r["supp_a"], r["supp_b"]) == key
        assert r["common_custs"] == commons[key]
        assert r["aa_score"] == pytest.approx(fp / AA_FP, rel=1e-12)


# ---------------------------------------------------------------------------
# rolling_interval_window — pandas time-window brute force
# ---------------------------------------------------------------------------


def test_rolling_interval_bruteforce(spark):
    from us_flight_bigdata_dashboard_spark.operators.relational import (
        q_rolling_interval_window,
    )

    od = _df("orders")
    od = od.assign(cents=np.round(od["o_totalprice"] * 100).astype(np.int64))
    hist: dict = {}
    for _, grp in od.groupby("o_custkey"):
        dates = grp["o_orderdate"].values
        cents = grp["cents"].values
        for i in range(len(grp)):
            lo = dates[i] - np.timedelta64(7, "D")
            mask = (dates >= lo) & (dates <= dates[i])
            tn = int(mask.sum())
            tc = int(cents[mask].sum())
            n, s = hist.get(tn, (0, 0))
            hist[tn] = (n + 1, s + tc)
    rows = {r["trailing_n"]: r for r in q_rolling_interval_window(spark, SF_DIR).collect()}
    assert set(rows) == set(hist)
    for tn, (n, s) in hist.items():
        assert rows[tn]["n_orders"] == n
        assert rows[tn]["sum_trailing_cents"] == s


# ---------------------------------------------------------------------------
# late-wave brute forces: Rényi-2 entropy, seasonal Mann-Kendall, Katz
# centrality, and the outer-join replay's batch recomputation
# ---------------------------------------------------------------------------


def test_renyi2_entropy_bruteforce(spark):
    from collections import Counter

    from us_flight_bigdata_dashboard_spark.operators.text import (
        q_text_renyi2_entropy,
    )

    docs = _df("documents")
    rows = {r["source"]: r for r in q_text_renyi2_entropy(spark, SF_DIR).collect()}
    for src, grp in docs.groupby("source"):
        c = Counter()
        for t in grp["text"]:
            c.update(w for w in str(t).lower().split(" ") if w)
        n = sum(c.values())
        sc2 = sum(v * v for v in c.values())
        eff = n * n / sc2
        r = rows[src]
        assert r["vocab"] == len(c)
        assert r["n_tokens"] == n
        assert r["eff_vocab"] == pytest.approx(eff, rel=1e-12)
        # engine log2 is 24-bit truncated square-and-compare
        assert r["renyi2_bits"] == pytest.approx(math.log2(eff), abs=1e-6)


def test_seasonal_mann_kendall_bruteforce(spark):
    from us_flight_bigdata_dashboard_spark.operators.evaluation import (
        q_seasonal_mann_kendall,
    )

    od = _df("orders")
    od = od.assign(
        yr=od["o_orderdate"].dt.year,
        mth=od["o_orderdate"].dt.month,
        cents=np.round(od["o_totalprice"] * 100).astype(np.int64),
    )
    monthly = od.groupby(["yr", "mth"])["cents"].sum()
    s = 0
    var = 0.0
    n_seasons = 0
    for m in sorted({k[1] for k in monthly.index}):
        ys = monthly.xs(m, level="mth").sort_index()
        vals = ys.values
        n = len(vals)
        n_seasons += 1
        for i in range(n):
            for j in range(i + 1, n):
                s += 1 if vals[j] > vals[i] else (-1 if vals[j] < vals[i] else 0)
        from collections import Counter

        ties = Counter(vals.tolist())
        tie_term = sum(t * (t - 1) * (2 * t + 5) for t in ties.values())
        var += (n * (n - 1) * (2 * n + 5) - tie_term) / 18.0
    (row,) = q_seasonal_mann_kendall(spark, SF_DIR).collect()
    assert row["n_seasons"] == n_seasons
    assert row["s"] == s
    assert row["var_s"] == pytest.approx(var, rel=1e-6)
    if s != 0:
        # the engine's var_s is fsum-quantized (scale 6); standardize
        # against ITS value, which approx-matches ours above
        z = (s - (1 if s > 0 else -1)) / math.sqrt(row["var_s"])
        assert row["z_stat"] == pytest.approx(z, rel=1e-12)


def test_katz_centrality_bruteforce(spark):
    from collections import defaultdict

    from us_flight_bigdata_dashboard_spark.operators.graph import (
        KATZ_ALPHA_DEN,
        KATZ_ALPHA_NUM,
        KATZ_FP,
        KATZ_ITERS,
        KATZ_TOP,
        q_graph_katz_centrality,
    )

    li = _df("lineitem")[["l_orderkey", "l_suppkey"]]
    od = _df("orders")[["o_orderkey", "o_custkey"]]
    cs = li.merge(od, left_on="l_orderkey", right_on="o_orderkey")[
        ["o_custkey", "l_suppkey"]
    ].drop_duplicates()
    adj = defaultdict(list)
    nodes = set()
    for _, r in cs.iterrows():
        c, s_ = 2 * int(r["o_custkey"]), 2 * int(r["l_suppkey"]) + 1
        adj[c].append(s_)
        adj[s_].append(c)
        nodes.add(c)
        nodes.add(s_)
    x = {n: 0 for n in nodes}
    w = {n: KATZ_FP for n in nodes}
    for _ in range(KATZ_ITERS):
        nbr = {n: sum(w[m] for m in adj[n]) for n in nodes}
        w = {n: (nbr[n] * KATZ_ALPHA_NUM) // KATZ_ALPHA_DEN for n in nodes}
        x = {n: x[n] + w[n] for n in nodes}
    lbl = {
        n: ("c:" if n % 2 == 0 else "s:") + str(n // 2) for n in nodes
    }
    want = sorted(((x[n], lbl[n]) for n in nodes), key=lambda t: (-t[0], t[1]))[
        :KATZ_TOP
    ]
    rows = q_graph_katz_centrality(spark, SF_DIR).collect()
    assert len(rows) == len(want)
    for r, (fp, label) in zip(rows, want):
        assert (r["node"], r["katz_fp"]) == (label, fp)
        assert r["katz"] == pytest.approx(fp / KATZ_FP, rel=1e-12)


def test_interval_join_outer_replay_semantics(spark):
    from us_flight_bigdata_dashboard_spark.streaming.replay import (
        q_streaming_interval_join_outer_replay,
    )

    rows = q_streaming_interval_join_outer_replay(spark, SF_DIR).collect()
    got = {(r["click_event_id"], r["view_event_id"]) for r in rows}
    assert len(got) == len(rows)  # exactly once, matched or flushed
    assert all(r["user_id"] >= 0 for r in rows)  # sentinel pair dropped

    ev = _df("events").dropna(subset=["ts"])
    clicks = ev[ev["event_type"] == "click"]
    views = ev[ev["event_type"] == "view"]
    expect = set()
    for _, c in clicks.iterrows():
        lo = c["ts"] - np.timedelta64(30, "m")
        m = views[
            (views["user_id"] == c["user_id"])
            & (views["ts"] <= c["ts"])
            & (views["ts"] >= lo)
        ]
        if len(m):
            for vid in m["event_id"]:
                expect.add((c["event_id"], vid))
        else:
            expect.add((c["event_id"], None))
    assert got == expect
    # the entry's subject: NULL rows for unmatched clicks really emitted
    assert any(v is None for _c, v in got)
