"""Ground-truth tests for the round-13 additions: brute-force
recomputations (pandas/numpy/pure Python) of every wave entry on
sf0.001."""

from __future__ import annotations

import math
import re
from fractions import Fraction

import duckdb
import numpy as np
import pandas as pd
import pytest

SF_DIR = "/root/testdata/sf0.001"


def _df(table: str):
    con = duckdb.connect()
    return con.execute(f"SELECT * FROM '{SF_DIR}/{table}.parquet'").df()


def _midranks(values: np.ndarray) -> np.ndarray:
    return pd.Series(values).rank(method="average").to_numpy()


def _two_samples():
    orders = _df("orders")
    x = orders.loc[orders["o_orderpriority"] == "1-URGENT", "o_totalprice"].to_numpy()
    y = orders.loc[orders["o_orderpriority"] != "1-URGENT", "o_totalprice"].to_numpy()
    return x, y


# ---------------------------------------------------------------------------
# mood_scale_test — brute midrank squared-deviation scores + exact
# hypergeometric standardization
# ---------------------------------------------------------------------------


def test_mood_scale_brute_force(spark):
    from us_flight_bigdata_dashboard_spark.operators.statistics import (
        q_mood_scale_test,
    )

    x, y = _two_samples()
    n1, n2 = len(x), len(y)
    n = n1 + n2
    rc = _midranks(np.concatenate([x, y]))
    q = (rc - (n + 1) / 2.0) ** 2
    q1 = q[:n1]
    t_ref = q1.sum()
    sq, sq2 = q.sum(), (q**2).sum()
    var = n1 * n2 * (n * sq2 - sq * sq) / (n * n * (n - 1))
    z_ref = (t_ref - n1 * sq / n) / math.sqrt(var)

    (row,) = q_mood_scale_test(spark, SF_DIR).collect()
    assert row["n1"] == n1 and row["n2"] == n2
    assert row["t_mood"] == pytest.approx(t_ref, rel=1e-10)
    assert row["z_mood"] == pytest.approx(z_ref, rel=1e-8)
    assert row["significant_5pct"] == int(abs(z_ref) > 1.959963984540054)


# ---------------------------------------------------------------------------
# cucconi_test — brute squared-rank / contrary-rank quadratic form
# ---------------------------------------------------------------------------


def test_cucconi_brute_force(spark):
    from us_flight_bigdata_dashboard_spark.operators.statistics import (
        q_cucconi_test,
    )

    x, y = _two_samples()
    n1, n2 = len(x), len(y)
    n = n1 + n2
    rc = _midranks(np.concatenate([x, y]))
    r1 = rc[:n1]
    s1 = (n + 1) - r1
    den = math.sqrt(n1 * n2 * (n + 1) * (2 * n + 1) * (8 * n + 11) / 5.0)
    u_ref = (6.0 * (r1**2).sum() - n1 * (n + 1) * (2 * n + 1)) / den
    v_ref = (6.0 * (s1**2).sum() - n1 * (n + 1) * (2 * n + 1)) / den
    rho_ref = 2.0 * (n * n - 4) / ((2 * n + 1) * (8 * n + 11)) - 1.0
    c_ref = (u_ref**2 + v_ref**2 - 2 * rho_ref * u_ref * v_ref) / (
        2 * (1 - rho_ref**2)
    )

    (row,) = q_cucconi_test(spark, SF_DIR).collect()
    assert row["n1"] == n1 and row["n2"] == n2
    assert row["u_stat"] == pytest.approx(u_ref, rel=1e-8)
    assert row["v_stat"] == pytest.approx(v_ref, rel=1e-8)
    assert row["rho"] == pytest.approx(rho_ref, rel=1e-12)
    assert row["cucconi_c"] == pytest.approx(c_ref, rel=1e-8)
    assert row["significant_5pct"] == int(c_ref > math.log(20.0))


# ---------------------------------------------------------------------------
# text_readability_panel — per-doc ARI / Coleman-Liau recomputation
# ---------------------------------------------------------------------------


def test_readability_panel_brute_force(spark):
    from us_flight_bigdata_dashboard_spark.operators.text import (
        q_text_readability_panel,
    )

    docs = _df("documents")
    rows = {}
    for src, grp in docs.groupby("source"):
        aris, clis = [], []
        for text in grp["text"]:
            w = len([t for t in text.lower().split(" ") if t != ""])
            if w == 0:
                continue
            sent = max(1, len(re.findall(r"[.!?]+", text)))
            alnum = len(re.sub(r"[^A-Za-z0-9]", "", text))
            letters = len(re.sub(r"[^A-Za-z]", "", text))
            aris.append(4.71 * (alnum / w) + 0.5 * (w / sent) - 21.43)
            clis.append(
                0.0588 * (100.0 * letters / w) - 0.296 * (100.0 * sent / w) - 15.8
            )
        a = np.array(aris)
        rows[src] = (
            len(aris),
            a.mean(),
            np.mean(clis),
            int((a > 12.0).sum()),
            (a > 12.0).sum() / len(aris),
        )

    got = q_text_readability_panel(spark, SF_DIR).collect()
    assert len(got) == len(rows)
    for r in got:
        n, ari, cli, hard, share = rows[r["source"]]
        assert r["n_docs"] == n
        assert r["mean_ari"] == pytest.approx(ari, abs=2e-4)  # fsum quantum
        assert r["mean_cli"] == pytest.approx(cli, abs=2e-4)
        assert r["n_hard_ari"] == hard
        assert r["hard_share"] == pytest.approx(share, rel=1e-12)


# ---------------------------------------------------------------------------
# graph_reciprocity — pandas dyad census
# ---------------------------------------------------------------------------


def test_graph_reciprocity_brute_force(spark):
    from us_flight_bigdata_dashboard_spark.operators.graph import (
        q_graph_reciprocity,
    )

    ev = _df("events").sort_values(["user_id", "ts", "event_id"])
    buckets = {}
    for uid, grp in ev.groupby("user_id"):
        types = grp["event_type"].tolist()
        dirs = set()
        for a, b in zip(types, types[1:]):
            if a != b:
                dirs.add((a, b))
        dyads = {}
        for a, b in dirs:
            key = (min(a, b), max(a, b))
            dyads.setdefault(key, set()).add(a < b)
        nd = len(dyads)
        if nd < 2:
            continue
        nm = sum(1 for v in dyads.values() if len(v) == 2)
        dec = min(9, (10 * nm) // nd)
        n_u, td, tm = buckets.get(dec, (0, 0, 0))
        buckets[dec] = (n_u + 1, td + nd, tm + nm)

    got = q_graph_reciprocity(spark, SF_DIR).collect()
    assert len(got) == len(buckets)
    for r in got:
        n_u, td, tm = buckets[r["recip_decile"]]
        assert r["n_users"] == n_u
        assert r["total_dyads"] == td
        assert r["total_mutual"] == tm
        assert r["pooled_reciprocity"] == pytest.approx(tm / td, rel=1e-12)


# ---------------------------------------------------------------------------
# average_precision_exact — brute optimistic-tie AP
# ---------------------------------------------------------------------------


def test_average_precision_brute_force(spark):
    from us_flight_bigdata_dashboard_spark.operators.evaluation import (
        q_average_precision_exact,
    )

    orders = _df("orders")
    v = orders["o_totalprice"].to_numpy()
    pos = (orders["o_orderpriority"] == "1-URGENT").to_numpy().astype(int)
    # optimistic tie order: score DESC, positives first within a tie
    order = np.lexsort((-pos, -v))
    rel = pos[order]
    tp = np.cumsum(rel)
    k = np.arange(1, len(rel) + 1)
    ap_ref = (tp[rel == 1] / k[rel == 1]).sum() / pos.sum()

    (row,) = q_average_precision_exact(spark, SF_DIR).collect()
    assert row["n_pos"] == int(pos.sum())
    assert row["n_neg"] == int(len(pos) - pos.sum())
    assert row["average_precision"] == pytest.approx(ap_ref, abs=1e-6)
    assert row["prevalence_baseline"] == pytest.approx(pos.mean(), rel=1e-12)


# ---------------------------------------------------------------------------
# youden_j_threshold — brute threshold sweep with exact tie-break
# ---------------------------------------------------------------------------


def test_youden_brute_force(spark):
    from us_flight_bigdata_dashboard_spark.operators.evaluation import (
        q_youden_j_threshold,
    )

    orders = _df("orders")
    v = orders["o_totalprice"].to_numpy()
    pos = (orders["o_orderpriority"] == "1-URGENT").to_numpy().astype(int)
    n_pos, n_neg = int(pos.sum()), int(len(pos) - pos.sum())
    best = None
    for t in np.unique(v):
        tp = int(pos[v >= t].sum())
        fp = int((1 - pos)[v >= t].sum())
        m = tp * n_neg - fp * n_pos  # exact integer J ranking
        if best is None or m > best[0] or (m == best[0] and t < best[1]):
            best = (m, t, tp, fp)
    _, t_ref, tp_ref, fp_ref = best

    (row,) = q_youden_j_threshold(spark, SF_DIR).collect()
    assert row["threshold"] == pytest.approx(t_ref, rel=1e-12)
    assert row["tp"] == tp_ref and row["fp"] == fp_ref
    assert row["tpr"] == pytest.approx(tp_ref / n_pos, rel=1e-12)
    assert row["fpr"] == pytest.approx(fp_ref / n_neg, rel=1e-12)
    assert row["youden_j"] == pytest.approx(
        tp_ref / n_pos - fp_ref / n_neg, rel=1e-10
    )


# ---------------------------------------------------------------------------
# lorenz_asymmetry — exact-Fraction recomputation per nation
# ---------------------------------------------------------------------------


def test_lorenz_asymmetry_brute_force(spark):
    from us_flight_bigdata_dashboard_spark.operators.statistics import (
        q_lorenz_asymmetry,
    )

    cust = _df("customer")[["c_custkey", "c_nationkey"]]
    orders = _df("orders")
    orders["cents"] = (orders["o_totalprice"] * 100).round(0).astype("int64")
    rev = orders.groupby("o_custkey")["cents"].sum()
    cust["x"] = cust["c_custkey"].map(rev).fillna(0).astype("int64")

    want = {}
    for nk, grp in cust.groupby("c_nationkey"):
        xs = sorted(int(t) for t in grp["x"])
        n, total = len(xs), sum(xs)
        below = [t for t in xs if t * n < total]
        m = len(below)
        if m < 1:
            want[int(nk)] = (n, m, None, None)
            continue
        x_m = max(below)
        x_up = min(t for t in xs if t * n >= total)
        delta = Fraction(total - x_m * n, (x_up - x_m) * n)
        s = (m + delta) / n + Fraction(sum(below) + delta * x_up) / total
        want[int(nk)] = (n, m, float(delta), float(s))

    got = q_lorenz_asymmetry(spark, SF_DIR).collect()
    assert len(got) == len(want)
    for r in got:
        n, m, delta, s = want[r["c_nationkey"]]
        assert r["n"] == n and r["m"] == m
        if s is None:
            assert r["lorenz_asymmetry"] is None
        else:
            assert r["delta"] == pytest.approx(delta, rel=1e-9)
            assert r["lorenz_asymmetry"] == pytest.approx(s, rel=1e-9)
            assert r["top_driven"] == int(s > 1.0)


# ---------------------------------------------------------------------------
# seasonal_decompose_additive — pandas centered-MA recomputation
# ---------------------------------------------------------------------------


def test_seasonal_decompose_brute_force(spark):
    from us_flight_bigdata_dashboard_spark.operators.events import (
        q_seasonal_decompose_additive,
    )

    ev = _df("events")
    daily = (
        ev.assign(day=pd.to_datetime(ev["ts"]).dt.date)
        .groupby("day")
        .size()
        .sort_index()
    )
    days = list(daily.index)
    ys = daily.to_numpy()
    rows = {}
    gnum, gcnt = 0, 0
    per = {}
    for i in range(len(days)):
        lo, hi = i - 3, i + 3
        if lo < 0 or hi >= len(days):
            continue
        if (days[hi] - days[lo]).days != 6:
            continue
        num7 = int(7 * ys[i] - ys[lo : hi + 1].sum())
        dow = days[i].isoweekday()
        n, s = per.get(dow, (0, 0))
        per[dow] = (n + 1, s + num7)
        gnum += num7
        gcnt += 1
    overall = gnum / (7.0 * gcnt)
    for dow, (n, s) in per.items():
        rows[dow] = (n, s / (7.0 * n), overall, s / (7.0 * n) - overall)

    got = q_seasonal_decompose_additive(spark, SF_DIR).collect()
    assert len(got) == len(rows)
    for r in got:
        n, raw, ov, cen = rows[r["dow"]]
        assert r["n_days"] == n
        assert r["seasonal_raw"] == pytest.approx(raw, rel=1e-12)
        assert r["overall_detrended_mean"] == pytest.approx(ov, rel=1e-12)
        assert r["seasonal"] == pytest.approx(cen, rel=1e-9)


def _daily_with_lags():
    ev = _df("events")
    daily = (
        ev.assign(day=pd.to_datetime(ev["ts"]).dt.date)
        .groupby("day")
        .size()
        .to_dict()
    )
    import datetime

    rows = []
    for day, y in sorted(daily.items()):
        d7 = daily.get(day - datetime.timedelta(days=7))
        d1 = daily.get(day - datetime.timedelta(days=1))
        if d7 is not None and d1 is not None:
            rows.append((day, int(y), int(d7), int(d1)))
    return rows


# ---------------------------------------------------------------------------
# diebold_mariano_test — brute loss-differential recomputation
# ---------------------------------------------------------------------------


def test_diebold_mariano_brute_force(spark):
    from us_flight_bigdata_dashboard_spark.operators.events import (
        q_diebold_mariano_test,
    )

    rows = _daily_with_lags()
    d = np.array([(y - f7) ** 2 - (y - f1) ** 2 for _, y, f7, f1 in rows], float)
    se1 = np.array([(y - f7) ** 2 for _, y, f7, f1 in rows], float)
    se2 = np.array([(y - f1) ** 2 for _, y, f7, f1 in rows], float)
    n = len(d)
    dm_ref = d.sum() * math.sqrt(n) / math.sqrt(n * (d**2).sum() - d.sum() ** 2)

    (row,) = q_diebold_mariano_test(spark, SF_DIR).collect()
    assert row["n"] == n
    assert row["mse_snaive"] == pytest.approx(se1.mean(), rel=1e-12)
    assert row["mse_naive"] == pytest.approx(se2.mean(), rel=1e-12)
    assert row["dm_stat"] == pytest.approx(dm_ref, rel=1e-8)
    assert row["better_method"] == (
        "seasonal_naive"
        if se1.sum() < se2.sum()
        else ("naive" if se1.sum() > se2.sum() else "tie")
    )


# ---------------------------------------------------------------------------
# forecast_rolling_origin — brute fold table
# ---------------------------------------------------------------------------


def test_rolling_origin_brute_force(spark):
    from us_flight_bigdata_dashboard_spark.operators.events import (
        q_forecast_rolling_origin,
    )

    rows = _daily_with_lags()
    dmin = min(r[0] for r in rows)
    span = (max(r[0] for r in rows) - dmin).days + 1
    folds = {}
    for day, y, f7, f1 in rows:
        f = min(3, (4 * (day - dmin).days) // span)
        n, t1, t2, first, last = folds.get(f, (0, 0, 0, day, day))
        folds[f] = (
            n + 1,
            t1 + abs(y - f7),
            t2 + abs(y - f1),
            min(first, day),
            max(last, day),
        )

    got = q_forecast_rolling_origin(spark, SF_DIR).collect()
    assert len(got) == len(folds)
    for r in got:
        n, t1, t2, first, last = folds[r["fold"]]
        assert r["n_days"] == n
        assert r["first_day"] == first and r["last_day"] == last
        assert r["tae_snaive"] == t1 and r["tae_naive"] == t2
        assert r["mae_snaive"] == pytest.approx(t1 / n, rel=1e-12)
        assert r["snaive_wins"] == int(t1 < t2)


# ---------------------------------------------------------------------------
# spiegelhalter_z — brute per-row Z on the md5-split segment model
# ---------------------------------------------------------------------------


def test_spiegelhalter_brute_force(spark):
    from us_flight_bigdata_dashboard_spark.operators.evaluation import (
        q_spiegelhalter_z,
    )

    orders = _df("orders")
    cust = _df("customer")[["c_custkey", "c_mktsegment"]]
    j = orders.merge(cust, left_on="o_custkey", right_on="c_custkey")
    j["y"] = (j["o_orderpriority"] == "1-URGENT").astype(int)
    import hashlib

    j["_b"] = j["o_custkey"].map(
        lambda k: int(hashlib.md5(str(int(k)).encode()).hexdigest()[:15], 16) % 100
    )
    train, test = j[j["_b"] < 80], j[j["_b"] >= 80]
    pnum = {
        seg: math.floor(g["y"].sum() / len(g) * 1e9)
        for seg, g in train.groupby("c_mktsegment")
    }
    num = den = 0.0
    n_test = 0
    for seg, g in test.groupby("c_mktsegment"):
        if seg not in pnum:
            continue
        p = pnum[seg] / 1e9
        n, sy = len(g), int(g["y"].sum())
        num += (sy - n * p) * (1 - 2 * p)
        den += n * (1 - 2 * p) ** 2 * p * (1 - p)
        n_test += n
    z_ref = num / math.sqrt(den)

    (row,) = q_spiegelhalter_z(spark, SF_DIR).collect()
    assert row["n_test"] == n_test
    assert row["z_spiegelhalter"] == pytest.approx(z_ref, rel=1e-6)
    assert row["significant_5pct"] == int(abs(z_ref) > 1.959963984540054)


# ---------------------------------------------------------------------------
# cuzick_trend_test — brute linear-rank trend with permutation variance
# ---------------------------------------------------------------------------


def test_cuzick_brute_force(spark):
    from us_flight_bigdata_dashboard_spark.operators.inference import (
        q_cuzick_trend_test,
    )

    orders = _df("orders")
    z = orders["o_orderpriority"].str[0].astype(int).to_numpy()
    r = _midranks(orders["o_totalprice"].to_numpy())
    n = len(z)
    t_ref = float((z * r).sum())
    e = z.sum() * r.sum() / n
    var = ((z - z.mean()) ** 2).sum() * ((r - r.mean()) ** 2).sum() / (n - 1)
    z_ref = (t_ref - e) / math.sqrt(var)

    (row,) = q_cuzick_trend_test(spark, SF_DIR).collect()
    assert row["n"] == n
    assert row["t_stat"] == pytest.approx(t_ref, rel=1e-10)
    assert row["z_cuzick"] == pytest.approx(z_ref, rel=1e-8)
    assert row["significant_5pct"] == int(abs(z_ref) > 1.959963984540054)


# ---------------------------------------------------------------------------
# pps_sequential_poisson — brute order-sampling selection
# ---------------------------------------------------------------------------


def test_sps_brute_force(spark):
    import hashlib

    from us_flight_bigdata_dashboard_spark.operators.sampling import (
        SPS_N,
        q_pps_sequential_poisson,
    )

    docs = _df("documents")[["doc_id", "n_chars"]]
    docs = docs[docs["n_chars"] > 0]
    rows = []
    for did, nc in docs.itertuples(index=False):
        u = int(hashlib.md5(str(int(did)).encode()).hexdigest()[:12], 16)
        rows.append((u / nc, u, int(did), int(nc)))
    rows.sort()
    t = int(docs["n_chars"].sum())
    want = rows[:SPS_N]

    got = q_pps_sequential_poisson(spark, SF_DIR).collect()
    assert len(got) == SPS_N
    for r, (xi, u, did, nc) in zip(got, want):
        assert r["doc_id"] == did and r["n_chars"] == nc
        assert r["xi"] == pytest.approx(xi, rel=1e-12)
        w_ref = 1.0 if nc * SPS_N >= t else t / (float(SPS_N) * nc)
        assert r["sps_weight"] == pytest.approx(w_ref, rel=1e-12)


# ---------------------------------------------------------------------------
# silver_meal_lot_sizing — pure-Python heuristic + DP optimum
# ---------------------------------------------------------------------------


def test_silver_meal_brute_force(spark):
    from us_flight_bigdata_dashboard_spark.operators.decision import (
        WW_HOLD_CENTS,
        WW_SETUP_CENTS,
        WW_T,
        WW_YEAR,
        q_silver_meal_lot_sizing,
    )

    li = _df("lineitem")
    li = li[pd.to_datetime(li["l_shipdate"]).dt.year == WW_YEAR]
    monthly = (
        li.assign(m=pd.to_datetime(li["l_shipdate"]).dt.month)
        .groupby("m")["l_quantity"]
        .sum()
        .astype(int)
        .to_dict()
    )
    d = [int(monthly.get(t, 0)) for t in range(1, WW_T + 1)]

    def c(j, t):  # 1-based inclusive, cents
        return WW_SETUP_CENTS + WW_HOLD_CENTS * sum(
            (i - j) * d[i - 1] for i in range(j, t + 1)
        )

    # Silver-Meal forward pass: extend while avg per-period cost does
    # not increase (exact integer cross-multiplication)
    j, cost, orders = 1, 0, 1
    for t in range(2, WW_T + 1):
        if c(j, t) * (t - j) <= c(j, t - 1) * (t - j + 1):
            continue
        cost += c(j, t - 1)
        j = t
        orders += 1
    sm_ref = cost + c(j, WW_T)

    # Wagner-Whitin exact DP
    f = [0] + [None] * WW_T
    for t in range(1, WW_T + 1):
        f[t] = min(f[jj - 1] + c(jj, t) for jj in range(1, t + 1))
    ww_ref = f[WW_T]

    (row,) = q_silver_meal_lot_sizing(spark, SF_DIR).collect()
    assert row["sm_cost_cents"] == sm_ref
    assert row["sm_n_orders"] == orders
    assert row["ww_optimal_cost_cents"] == ww_ref
    assert row["sm_gap_cents"] == sm_ref - ww_ref
    assert row["sm_gap_cents"] >= 0  # heuristic never beats the optimum


# ---------------------------------------------------------------------------
# yuen_trimmed_ttest — numpy trimmed/winsorized recomputation
# ---------------------------------------------------------------------------


def test_yuen_brute_force(spark):
    from us_flight_bigdata_dashboard_spark.operators.statistics import (
        q_yuen_trimmed_ttest,
    )

    x, y = _two_samples()

    def stats(vals):
        cents = np.sort(np.round(vals * 100).astype(np.int64))
        n = len(cents)
        g = (n * 20) // 100
        mid = cents[g : n - g]
        h = n - 2 * g
        tm = mid.sum() / h
        w = np.concatenate([np.full(g, cents[g]), mid, np.full(g, cents[n - g - 1])])
        sw, sw2 = int(w.sum()), int((w.astype(object) ** 2).sum())
        var_num = n * sw2 - sw * sw
        d = var_num / (n * h * (h - 1))
        return n, h, tm, d

    n1, h1, tm1, d1 = stats(x)
    n2, h2, tm2, d2 = stats(y)
    s = d1 + d2
    t_ref = (tm1 - tm2) / math.sqrt(s)
    df_ref = s * s / (d1 * d1 / (h1 - 1) + d2 * d2 / (h2 - 1))

    (row,) = q_yuen_trimmed_ttest(spark, SF_DIR).collect()
    assert row["n1"] == n1 and row["n2"] == n2
    assert row["h1"] == h1 and row["h2"] == h2
    assert row["trimmed_mean_urgent_cents"] == pytest.approx(tm1, rel=1e-12)
    assert row["trimmed_mean_rest_cents"] == pytest.approx(tm2, rel=1e-12)
    assert row["yuen_t"] == pytest.approx(t_ref, rel=1e-9)
    assert row["df_satterthwaite"] == pytest.approx(df_ref, rel=1e-9)


# ---------------------------------------------------------------------------
# anderson_darling_two — brute tie-adjusted A2akN (Scholz-Stephens eq. 7)
# ---------------------------------------------------------------------------


def test_anderson_darling_brute_force(spark):
    from us_flight_bigdata_dashboard_spark.operators.statistics import (
        q_anderson_darling_two,
    )

    x, y = _two_samples()
    n1, n2 = len(x), len(y)
    n = n1 + n2
    vals = np.unique(np.concatenate([x, y]))
    c1 = pd.Series(x).value_counts()
    c2 = pd.Series(y).value_counts()
    t1 = t2 = 0
    total = 0.0
    for v in vals:
        l1, l2 = int(c1.get(v, 0)), int(c2.get(v, 0))
        l = l1 + l2
        b = (t1 + t2) + l / 2.0
        m1 = t1 + l1 / 2.0
        m2 = t2 + l2 / 2.0
        den = b * (n - b) - n * l / 4.0
        if den > 0:
            total += (l / n) * (
                (n * m1 - n1 * b) ** 2 / (n1 * den)
                + (n * m2 - n2 * b) ** 2 / (n2 * den)
            )
        t1 += l1
        t2 += l2
    ad_ref = (n - 1) / n * total

    (row,) = q_anderson_darling_two(spark, SF_DIR).collect()
    assert row["n1"] == n1 and row["n2"] == n2
    assert row["n_values"] == len(vals)
    assert row["ad_stat"] == pytest.approx(ad_ref, rel=1e-6)


# ---------------------------------------------------------------------------
# breusch_pagan_het — numpy OLS + auxiliary regression
# ---------------------------------------------------------------------------


def test_breusch_pagan_brute_force(spark):
    from us_flight_bigdata_dashboard_spark.operators.statistics import (
        q_breusch_pagan_het,
    )

    li = _df("lineitem")
    xq = li["l_quantity"].astype(np.int64).to_numpy()
    yc = (li["l_extendedprice"] * 100).round(0).astype(np.int64).to_numpy()
    yu = yc / 1e5
    n = len(xq)
    b = (n * (xq * yu).sum() - xq.sum() * yu.sum()) / (
        n * (xq.astype(np.int64) ** 2).sum() - xq.sum() ** 2
    )
    a = (yu.sum() - b * xq.sum()) / n
    z = (yu - a - b * xq) ** 2
    cov = n * (z * xq).sum() - xq.sum() * z.sum()
    r2 = cov * cov / (
        (n * (xq**2).sum() - xq.sum() ** 2) * (n * (z**2).sum() - z.sum() ** 2)
    )
    lm_ref = n * r2

    (row,) = q_breusch_pagan_het(spark, SF_DIR).collect()
    assert row["n"] == n
    assert row["slope"] == pytest.approx(b, rel=1e-12)
    assert row["r2_aux"] == pytest.approx(r2, rel=1e-5)  # fsum quantum
    assert row["bp_lm"] == pytest.approx(lm_ref, rel=1e-5)


# ---------------------------------------------------------------------------
# granger_causality_1lag — numpy lstsq recomputation
# ---------------------------------------------------------------------------


def test_granger_brute_force(spark):
    from us_flight_bigdata_dashboard_spark.operators.events import (
        q_granger_causality_1lag,
    )

    ev = _df("events")
    daily = (
        ev.assign(day=pd.to_datetime(ev["ts"]).dt.date)
        .groupby("day")["event_type"]
        .agg(
            clicks=lambda s: int((s == "click").sum()),
            views=lambda s: int((s == "view").sum()),
        )
    )
    import datetime

    rows = []
    idx = {d: (int(r["clicks"]), int(r["views"])) for d, r in daily.iterrows()}
    for d, (c, v) in sorted(idx.items()):
        p = idx.get(d - datetime.timedelta(days=1))
        if p is not None:
            rows.append((c, p[0], p[1]))
    yv = np.array([r[0] for r in rows], float)
    yl = np.array([r[1] for r in rows], float)
    xl = np.array([r[2] for r in rows], float)
    n = len(yv)
    Xr = np.column_stack([np.ones(n), yl])
    Xu = np.column_stack([np.ones(n), yl, xl])
    br, *_ = np.linalg.lstsq(Xr, yv, rcond=None)
    bu, *_ = np.linalg.lstsq(Xu, yv, rcond=None)
    rss_r = ((yv - Xr @ br) ** 2).sum()
    rss_u = ((yv - Xu @ bu) ** 2).sum()
    f_ref = (rss_r - rss_u) * (n - 3) / rss_u

    (row,) = q_granger_causality_1lag(spark, SF_DIR).collect()
    assert row["n"] == n
    assert row["rss_restricted"] == pytest.approx(rss_r, rel=1e-6)
    assert row["rss_unrestricted"] == pytest.approx(rss_u, rel=1e-6)
    assert row["views_coef"] == pytest.approx(bu[2], rel=1e-6)
    assert row["f_stat"] == pytest.approx(f_ref, rel=1e-5)


# ---------------------------------------------------------------------------
# graph_harmonic_radius — pandas brute BFS-2 on the capped edge set
# ---------------------------------------------------------------------------


def test_harmonic_radius_brute_force(spark):
    from us_flight_bigdata_dashboard_spark.operators.graph import (
        HARMONIC_TOP,
        MIN_COSUPPORT,
        PARTS_PER_ORDER_CAP,
        q_graph_harmonic_radius,
    )

    li = _df("lineitem")[["l_orderkey", "l_partkey"]].drop_duplicates()
    sizes = li.groupby("l_orderkey").size()
    keep = sizes[sizes <= PARTS_PER_ORDER_CAP].index
    li = li[li["l_orderkey"].isin(keep)]
    from collections import defaultdict
    from itertools import combinations

    support = defaultdict(int)
    for _, grp in li.groupby("l_orderkey"):
        for a, b in combinations(sorted(grp["l_partkey"]), 2):
            support[(a, b)] += 1
    adj = defaultdict(set)
    for (a, b), s in support.items():
        if s >= MIN_COSUPPORT:
            adj[a].add(b)
            adj[b].add(a)
    rows = []
    for u in adj:
        n1 = len(adj[u])
        two = set()
        for m in adj[u]:
            two |= adj[m]
        two -= adj[u]
        two.discard(u)
        rows.append((2 * n1 + len(two), u, n1, len(two)))
    rows.sort(key=lambda r: (-r[0], r[1]))
    want = rows[:HARMONIC_TOP]

    got = q_graph_harmonic_radius(spark, SF_DIR).collect()
    assert len(got) == len(want)
    for r, (h2x2, u, n1, n2) in zip(got, want):
        assert r["part"] == u
        assert r["n_dist1"] == n1 and r["n_dist2"] == n2
        assert r["harmonic_r2"] == pytest.approx(h2x2 / 2.0, rel=1e-12)


# ---------------------------------------------------------------------------
# breslow_day_test — brute quadratic fitted cells under the MH estimate
# ---------------------------------------------------------------------------


def test_breslow_day_brute_force(spark):
    from us_flight_bigdata_dashboard_spark.operators.inference import (
        MH_BAL_THRESHOLD,
        q_breslow_day_test,
    )

    orders = _df("orders")[["o_custkey", "o_orderpriority"]]
    cust = _df("customer")[["c_custkey", "c_mktsegment", "c_acctbal"]]
    j = orders.merge(cust, left_on="o_custkey", right_on="c_custkey")
    j["e"] = (j["c_acctbal"] > MH_BAL_THRESHOLD).astype(int)
    j["d"] = (j["o_orderpriority"] == "1-URGENT").astype(int)
    cells = {}
    for seg, g in j.groupby("c_mktsegment"):
        a = int(((g.e == 1) & (g.d == 1)).sum())
        b = int(((g.e == 1) & (g.d == 0)).sum())
        c = int(((g.e == 0) & (g.d == 1)).sum())
        dd = int(((g.e == 0) & (g.d == 0)).sum())
        cells[seg] = (a, b, c, dd)
    psi = sum(a * dd / (a + b + c + dd) for a, b, c, dd in cells.values()) / sum(
        b * c / (a + b + c + dd) for a, b, c, dd in cells.values()
    )
    bd = 0.0
    for a, b, c, dd in cells.values():
        m1, t1, m0 = a + b, a + c, c + dd
        qa, qb, qc = psi - 1.0, -(psi * (m1 + t1) + (m0 - t1)), psi * m1 * t1
        disc = math.sqrt(qb * qb - 4 * qa * qc)
        r1, r2 = (-qb + disc) / (2 * qa), (-qb - disc) / (2 * qa)
        lo, hi = max(0.0, t1 - m0), min(m1, t1)
        e = r2 if lo < r2 < hi else r1
        v = 1.0 / (1 / e + 1 / (m1 - e) + 1 / (t1 - e) + 1 / (m0 - t1 + e))
        bd += (a - e) ** 2 / v

    (row,) = q_breslow_day_test(spark, SF_DIR).collect()
    assert row["mh_or"] == pytest.approx(psi, rel=1e-12)
    assert row["bd_stat"] == pytest.approx(bd, rel=1e-9)
    assert row["heterogeneous_5pct"] == int(bd > 9.487729036781154)


# ---------------------------------------------------------------------------
# cmh_test — brute stratified chi-square
# ---------------------------------------------------------------------------


def _mh_cells():
    orders = _df("orders")[["o_custkey", "o_orderpriority"]]
    cust = _df("customer")[["c_custkey", "c_mktsegment", "c_acctbal"]]
    j = orders.merge(cust, left_on="o_custkey", right_on="c_custkey")
    j["e"] = (j["c_acctbal"] > 4500.0).astype(int)
    j["d"] = (j["o_orderpriority"] == "1-URGENT").astype(int)
    cells = {}
    for seg, g in j.groupby("c_mktsegment"):
        cells[seg] = (
            int(((g.e == 1) & (g.d == 1)).sum()),
            int(((g.e == 1) & (g.d == 0)).sum()),
            int(((g.e == 0) & (g.d == 1)).sum()),
            int(((g.e == 0) & (g.d == 0)).sum()),
        )
    return cells


def test_cmh_brute_force(spark):
    from us_flight_bigdata_dashboard_spark.operators.inference import q_cmh_test

    dev = var = 0.0
    for a, b, c, dd in _mh_cells().values():
        n = a + b + c + dd
        m1, m0, t1, t0 = a + b, c + dd, a + c, b + dd
        dev += a - m1 * t1 / n
        var += m1 * m0 * t1 * t0 / (n * n * (n - 1))
    stat = dev * dev / var

    (row,) = q_cmh_test(spark, SF_DIR).collect()
    assert row["cmh_chi2"] == pytest.approx(stat, rel=1e-9)
    assert row["significant_5pct"] == int(stat > 3.841458820694124)


# ---------------------------------------------------------------------------
# bhattacharyya_binned — brute binned BC/Hellinger
# ---------------------------------------------------------------------------


def test_bhattacharyya_brute_force(spark):
    from us_flight_bigdata_dashboard_spark.operators.statistics import (
        BHAT_BINS,
        q_bhattacharyya_binned,
    )

    orders = _df("orders")
    v = orders["o_totalprice"].astype(float).to_numpy()
    g = (orders["o_orderpriority"] == "1-URGENT").to_numpy()
    vmin, vmax = v.min(), v.max()
    b = np.minimum(
        BHAT_BINS - 1, np.floor((v - vmin) * BHAT_BINS / (vmax - vmin))
    ).astype(int)
    n1, n2 = int(g.sum()), int((~g).sum())
    bc = 0.0
    for bi in np.unique(b):
        c1 = int((g & (b == bi)).sum())
        c2 = int((~g & (b == bi)).sum())
        bc += math.sqrt((c1 / n1) * (c2 / n2))

    (row,) = q_bhattacharyya_binned(spark, SF_DIR).collect()
    assert row["n1"] == n1 and row["n2"] == n2
    assert row["bhattacharyya"] == pytest.approx(bc, abs=1e-10)
    assert row["hellinger"] == pytest.approx(math.sqrt(max(0.0, 1 - bc)), abs=1e-9)


# ---------------------------------------------------------------------------
# benford_mad_conformity — brute digit shares + Nigrini bands
# ---------------------------------------------------------------------------


def test_benford_mad_brute_force(spark):
    from us_flight_bigdata_dashboard_spark.operators.audit import (
        q_benford_mad_conformity,
    )

    orders = _df("orders")
    first = orders["o_totalprice"].apply(lambda x: int(str(int(math.floor(x)))[0]))
    n = len(first)
    devs = {
        d: abs((first == d).sum() / n - math.log10(1 + 1 / d)) for d in range(1, 10)
    }
    mad = sum(devs.values()) / 9.0
    worst = min(d for d in range(1, 10) if devs[d] == max(devs.values()))
    verdict = (
        "close"
        if mad <= 0.006
        else "acceptable"
        if mad <= 0.012
        else "marginal"
        if mad <= 0.015
        else "nonconformity"
    )

    (row,) = q_benford_mad_conformity(spark, SF_DIR).collect()
    assert row["n"] == n
    assert row["mad"] == pytest.approx(mad, rel=1e-9)
    assert row["worst_digit"] == worst
    assert row["conformity"] == verdict


# ---------------------------------------------------------------------------
# sketch_bloom_filter — brute bit-set membership
# ---------------------------------------------------------------------------


def test_bloom_brute_force(spark):
    import hashlib

    from us_flight_bigdata_dashboard_spark.operators.sketches import (
        BLOOM_K,
        BLOOM_M,
        q_sketch_bloom_filter,
    )

    cust = _df("customer")[["c_custkey", "c_mktsegment"]]

    def pos(k, j):
        return (
            int(hashlib.md5(f"{int(k)}#{j}".encode()).hexdigest()[:12], 16) % BLOOM_M
        )

    ins = cust.loc[cust["c_mktsegment"] == "BUILDING", "c_custkey"]
    probes = cust.loc[cust["c_mktsegment"] == "MACHINERY", "c_custkey"]
    bits = {pos(k, j) for k in ins for j in range(BLOOM_K)}
    fp = sum(
        1
        for k in probes
        if all(pos(k, j) in bits for j in range(BLOOM_K))
    )

    (row,) = q_sketch_bloom_filter(spark, SF_DIR).collect()
    assert row["n_inserted"] == len(set(ins))
    assert row["bits_set"] == len(bits)
    assert row["n_probes"] == len(probes)
    assert row["n_false_positive"] == fp
    assert row["measured_fpp"] == pytest.approx(fp / len(probes), rel=1e-12)


# ---------------------------------------------------------------------------
# inventory_ss_policy — pure-Python month-by-month simulation
# ---------------------------------------------------------------------------


def test_ss_policy_brute_force(spark):
    from us_flight_bigdata_dashboard_spark.operators.decision import (
        SS_T,
        WW_YEAR,
        q_inventory_ss_policy,
    )

    li = _df("lineitem")
    li = li[pd.to_datetime(li["l_shipdate"]).dt.year == WW_YEAR]
    part = _df("part")[["p_partkey", "p_brand"]]
    j = li.merge(part, left_on="l_partkey", right_on="p_partkey")
    j["m"] = pd.to_datetime(j["l_shipdate"]).dt.month
    want = {}
    for brand, g in j.groupby("p_brand"):
        d = [int(g.loc[g["m"] == t, "l_quantity"].sum()) for t in range(1, SS_T + 1)]
        total = sum(d)
        s_big = (2 * total) // SS_T
        s_small = s_big // 2
        pos, lost, orders = s_big, 0, 0
        for dt in d:
            if pos < s_small:
                orders += 1
                pos = s_big
            sold = min(dt, pos)
            lost += dt - sold
            pos -= sold
        want[brand] = (s_small, s_big, total, orders, lost, pos)

    got = q_inventory_ss_policy(spark, SF_DIR).collect()
    assert len(got) == len(want)
    for r in got:
        s_small, s_big, total, orders, lost, pos = want[r["p_brand"]]
        assert (r["s_small"], r["s_big"], r["total_demand"]) == (
            s_small,
            s_big,
            total,
        )
        assert r["n_orders"] == orders and r["total_lost"] == lost
        assert r["end_position"] == pos
        if total > 0:
            assert r["fill_rate"] == pytest.approx(1 - lost / total, rel=1e-12)


# ---------------------------------------------------------------------------
# auc_delong_se — brute placement-variance DeLong SE
# ---------------------------------------------------------------------------


def test_auc_delong_brute_force(spark):
    from us_flight_bigdata_dashboard_spark.operators.evaluation import (
        q_auc_delong_se,
    )

    orders = _df("orders")
    v = orders["o_totalprice"].to_numpy()
    pos = (orders["o_orderpriority"] == "1-URGENT").to_numpy()
    x, y = v[pos], v[~pos]
    n1, n0 = len(x), len(y)
    # placements via midranks (the standard DeLong V10/V01 construction)
    rc = _midranks(np.concatenate([x, y]))
    rx, ry = _midranks(x), _midranks(y)
    v10 = (rc[:n1] - rx) / n0
    v01 = 1.0 - (rc[n1:] - ry) / n1
    auc = v10.mean()
    s10 = v10.var(ddof=1)
    s01 = v01.var(ddof=1)
    se = math.sqrt(s10 / n1 + s01 / n0)

    (row,) = q_auc_delong_se(spark, SF_DIR).collect()
    assert row["n1"] == n1 and row["n0"] == n0
    assert row["auc"] == pytest.approx(auc, rel=1e-10)
    assert row["se_delong"] == pytest.approx(se, rel=1e-8)
    assert row["ci95_lo"] == pytest.approx(auc - 1.959963984540054 * se, rel=1e-8)


# ---------------------------------------------------------------------------
# robust_moments_bowley — numpy octile rank-pick recomputation
# ---------------------------------------------------------------------------


def test_bowley_moors_brute_force(spark):
    from us_flight_bigdata_dashboard_spark.operators.statistics import (
        q_robust_moments_bowley,
    )

    orders = _df("orders")
    want = {}
    for pri, g in orders.groupby("o_orderpriority"):
        cents = np.sort((g["o_totalprice"] * 100).round(0).astype(np.int64))
        n = len(cents)
        e = {k: int(cents[(k * n + 7) // 8 - 1]) for k in range(1, 8)}
        ir = e[6] - e[2]
        bow = (e[6] + e[2] - 2 * e[4]) / ir if ir > 0 else None
        moo = ((e[7] - e[5]) + (e[3] - e[1])) / ir if ir > 0 else None
        want[pri] = (n, e[2], e[4], e[6], bow, moo)

    got = q_robust_moments_bowley(spark, SF_DIR).collect()
    assert len(got) == len(want)
    for r in got:
        n, q1, med, q3, bow, moo = want[r["o_orderpriority"]]
        assert r["n_orders"] == n
        assert (r["q1_cents"], r["median_cents"], r["q3_cents"]) == (q1, med, q3)
        assert r["bowley_skewness"] == pytest.approx(bow, rel=1e-12)
        assert r["moors_kurtosis"] == pytest.approx(moo, rel=1e-12)


# ---------------------------------------------------------------------------
# queueing_mmc_erlang — closed-form Erlang C recomputation
# ---------------------------------------------------------------------------


def test_mmc_erlang_brute_force(spark):
    from us_flight_bigdata_dashboard_spark.operators.decision import (
        MM1_DAYS,
        MM1_MU_PER_DAY,
        MM1_YEAR,
        MMC_C,
        q_queueing_mmc_erlang,
    )

    li = _df("lineitem")
    li = li[pd.to_datetime(li["l_shipdate"]).dt.year == MM1_YEAR]
    jobs = li.groupby("l_suppkey").size()

    def erlang(n_jobs):
        lam = n_jobs / MM1_DAYS
        a = lam / MM1_MU_PER_DAY
        rho = a / MMC_C
        if rho >= 1:
            return lam, rho, None, None, None
        top = a**MMC_C / math.factorial(MMC_C) / (1 - rho)
        s = sum(a**k / math.factorial(k) for k in range(MMC_C))
        pw = top / (s + top)
        lq = pw * rho / (1 - rho)
        return lam, rho, pw, lq, lq / lam

    got = q_queueing_mmc_erlang(spark, SF_DIR).collect()
    rows = sorted(
        ((int(n), int(k)) for k, n in jobs.items()), key=lambda t: (-t[0], t[1])
    )[: len(got)]
    for r, (n, k) in zip(got, rows):
        assert r["suppkey"] == k and r["n_jobs"] == n
        lam, rho, pw, lq, wq = erlang(n)
        assert r["rho"] == pytest.approx(rho, rel=1e-12)
        if pw is not None:
            assert r["p_wait"] == pytest.approx(pw, rel=1e-9)
            assert r["lq_jobs"] == pytest.approx(lq, rel=1e-9)
            assert r["wq_days"] == pytest.approx(wq, rel=1e-9)


# ---------------------------------------------------------------------------
# brr_variance_estimate — brute Hadamard half-sample replication
# ---------------------------------------------------------------------------


def test_brr_brute_force(spark):
    import hashlib

    from us_flight_bigdata_dashboard_spark.operators.sampling import (
        BRR_STRATA,
        _hadamard8,
        q_brr_variance_estimate,
    )

    orders = _df("orders")
    cells_u = {}
    cells_n = {}
    for k, pri in zip(orders["o_custkey"], orders["o_orderpriority"]):
        h16 = int(hashlib.md5(str(int(k)).encode()).hexdigest()[:12], 16) % (
            2 * BRR_STRATA
        )
        key = (h16 // 2, h16 % 2)
        cells_n[key] = cells_n.get(key, 0) + 1
        cells_u[key] = cells_u.get(key, 0) + int(pri == "1-URGENT")
    had = _hadamard8()
    tot_u = sum(cells_u.values())
    tot_n = sum(cells_n.values())
    theta = tot_u / tot_n
    var = 0.0
    for r in range(BRR_STRATA):
        num = sum(
            cells_u.get((h, 0 if had[r][h] == 1 else 1), 0)
            for h in range(BRR_STRATA)
        )
        den = sum(
            cells_n.get((h, 0 if had[r][h] == 1 else 1), 0)
            for h in range(BRR_STRATA)
        )
        var += (num / den - theta) ** 2
    var /= BRR_STRATA

    (row,) = q_brr_variance_estimate(spark, SF_DIR).collect()
    assert row["n_orders"] == tot_n
    assert row["theta_urgent_share"] == pytest.approx(theta, rel=1e-12)
    assert row["se_brr"] == pytest.approx(math.sqrt(var), rel=1e-9)


# ---------------------------------------------------------------------------
# text_vocab_gini — pandas token-frequency Gini
# ---------------------------------------------------------------------------


def test_vocab_gini_brute_force(spark):
    from us_flight_bigdata_dashboard_spark.operators.text import q_text_vocab_gini

    docs = _df("documents")
    want = {}
    for src, grp in docs.groupby("source"):
        counts = {}
        for text in grp["text"]:
            for t in text.lower().split(" "):
                if t:
                    counts[t] = counts.get(t, 0) + 1
        cs = sorted(counts.values())
        v, s = len(cs), sum(cs)
        sic = sum((i + 1) * c for i, c in enumerate(cs))
        g = (2 * sic - (v + 1) * s) / (v * s) if v > 1 else None
        want[src] = (v, s, g)

    got = q_text_vocab_gini(spark, SF_DIR).collect()
    assert len(got) == len(want)
    for r in got:
        v, s, g = want[r["source"]]
        assert r["vocab"] == v and r["n_tokens"] == s
        assert r["gini_token_freq"] == pytest.approx(g, rel=1e-12)


# ---------------------------------------------------------------------------
# dunn_posthoc_test — brute pairwise rank comparisons with tie correction
# ---------------------------------------------------------------------------


def test_dunn_brute_force(spark):
    from us_flight_bigdata_dashboard_spark.operators.inference import (
        q_dunn_posthoc_test,
    )

    orders = _df("orders")
    v = orders["o_totalprice"].to_numpy()
    g = orders["o_orderpriority"].to_numpy()
    ranks = _midranks(v)
    n = len(v)
    counts = pd.Series(v).value_counts().to_numpy()
    tie3 = float((counts.astype(np.int64) ** 3 - counts).sum())
    vpool = n * (n + 1) / 12.0 - tie3 / (12.0 * (n - 1))
    want = {}
    gs = sorted(set(g))
    for i, g1 in enumerate(gs):
        for g2 in gs[i + 1 :]:
            r1, r2 = ranks[g == g1], ranks[g == g2]
            diff = r1.mean() - r2.mean()
            z = diff / math.sqrt(vpool * (1 / len(r1) + 1 / len(r2)))
            want[(g1, g2)] = (len(r1), len(r2), diff, z)

    got = q_dunn_posthoc_test(spark, SF_DIR).collect()
    assert len(got) == len(want)
    for r in got:
        n1, n2, diff, z = want[(r["g1"], r["g2"])]
        assert r["n1"] == n1 and r["n2"] == n2
        assert r["mean_rank_diff"] == pytest.approx(diff, rel=1e-10)
        assert r["z_dunn"] == pytest.approx(z, rel=1e-9)
        assert r["significant_bonf"] == int(abs(z) > 2.807033768343811)


# ---------------------------------------------------------------------------
# kappa_weighted — brute quadratic/linear weighted kappa
# ---------------------------------------------------------------------------


def test_kappa_weighted_brute_force(spark):
    from us_flight_bigdata_dashboard_spark.operators.inference import (
        WK_CHAR_CUTS,
        WK_TOKEN_CUTS,
        q_kappa_weighted,
    )

    docs = _df("documents")
    ra = docs["n_chars"].apply(
        lambda x: 0 if x < WK_CHAR_CUTS[0] else (1 if x < WK_CHAR_CUTS[1] else 2)
    )
    ntok = docs["text"].apply(lambda t: len([x for x in t.split(" ") if x]))
    rb = ntok.apply(
        lambda x: 0 if x < WK_TOKEN_CUTS[0] else (1 if x < WK_TOKEN_CUTS[1] else 2)
    )
    n = len(docs)
    o = np.zeros((3, 3), dtype=np.int64)
    for i, j in zip(ra, rb):
        o[i][j] += 1
    r, c = o.sum(axis=1), o.sum(axis=0)

    def kap(w):
        num = sum(w(i, j) * o[i][j] for i in range(3) for j in range(3))
        den = sum(w(i, j) * r[i] * c[j] for i in range(3) for j in range(3))
        return 1.0 - n * num / den

    kq = kap(lambda i, j: (i - j) ** 2)
    kl = kap(lambda i, j: abs(i - j))

    (row,) = q_kappa_weighted(spark, SF_DIR).collect()
    assert row["n"] == n
    assert row["kappa_quadratic"] == pytest.approx(kq, rel=1e-10)
    assert row["kappa_linear"] == pytest.approx(kl, rel=1e-10)
