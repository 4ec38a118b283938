"""Ground-truth tests for the round-10 wave-4 operators: scipy-free
numpy/pandas brute forces of Cochran's Q, Lin's CCC and Bland-Altman
moments, Goodman-Kruskal gamma and Cliff's delta (O(n²) pair counting),
the two-sample Cramér-von Mises ECDF sum, Jonckheere-Terpstra pairwise
U's, Mood's median 2×3 chi-square, Yule's K and TV distance from raw
Counters, the Gini split-gain stump search, the theta A-not-B exact-mode
collapse, a Python re-simulation of the recursive-CTE drain schedule,
and a pandas top-k re-derivation of the LATERAL join — on sf0.001 where
exhaustive recomputation is cheap."""

from __future__ import annotations

import collections
import math

import duckdb
import numpy as np
import pytest

SF_DIR = "/root/testdata/sf0.001"


def _df(table: str):
    con = duckdb.connect()
    return con.execute(f"SELECT * FROM '{SF_DIR}/{table}.parquet'").df()


# ---------------------------------------------------------------------------
# cochrans_q_test
# ---------------------------------------------------------------------------


def test_cochrans_q_bruteforce(spark):
    from us_flight_bigdata_dashboard_spark.operators.inference import (
        COCHRAN_Q_YEAR,
        q_cochrans_q_test,
    )

    od = _df("orders")
    od = od[od["o_orderdate"].dt.year == COCHRAN_Q_YEAR]
    pairs = set(zip(od["o_custkey"], od["o_orderdate"].dt.quarter))
    g = collections.Counter(q for _, q in pairs)
    li = collections.Counter(c for c, _ in pairs)
    t = sum(g.values())
    sg2 = sum(v * v for v in g.values())
    sl2 = sum(v * v for v in li.values())
    k = 4
    q_expected = (k - 1) * (k * sg2 - t * t) / (k * t - sl2)
    (row,) = q_cochrans_q_test(spark, SF_DIR).collect()
    assert row["n_subjects"] == len(li)
    assert row["total_active_marks"] == t
    assert row["q_stat"] == pytest.approx(q_expected, rel=1e-12)
    assert row["significant_5pct"] == int(q_expected > 7.814728)


# ---------------------------------------------------------------------------
# lin_ccc_agreement / bland_altman_agreement (shared monthly frame)
# ---------------------------------------------------------------------------


def _monthly_gross_net():
    # the CENTS rounding must be the engines' half-up (numpy rounds
    # half-even — exact .5 boundaries exist in price*(1-discount)*100),
    # so build the monthly frame in DuckDB; the statistic recomputation
    # below stays independent numpy
    con = duckdb.connect()
    frame = con.execute(
        f"""
        SELECT date_trunc('month', l_shipdate) AS m,
               SUM(CAST(round(l_extendedprice * 100, 0) AS BIGINT)) AS gc,
               SUM(CAST(round(l_extendedprice * (1.0 - l_discount) * 100, 0) AS BIGINT)) AS nc
        FROM '{SF_DIR}/lineitem.parquet' GROUP BY 1
        """
    ).df()
    return frame["gc"].values / 1e9, frame["nc"].values / 1e9


def test_lin_ccc_matches_numpy(spark):
    from us_flight_bigdata_dashboard_spark.operators.evaluation import (
        q_lin_ccc_agreement,
    )

    x, y = _monthly_gross_net()
    n = len(x)
    mx, my = x.mean(), y.mean()
    vx, vy = x.var(), y.var()  # population
    cov = (x * y).mean() - mx * my
    r = cov / math.sqrt(vx * vy)
    ccc = 2 * cov / (vx + vy + (mx - my) ** 2)
    (row,) = q_lin_ccc_agreement(spark, SF_DIR).collect()
    assert row["n_months"] == n
    assert row["pearson_r"] == pytest.approx(r, rel=1e-9)
    assert row["lin_ccc"] == pytest.approx(ccc, rel=1e-9)
    assert row["bias_correction_cb"] == pytest.approx(ccc / r, rel=1e-9)
    # CCC must be <= |r| (the bias-correction factor is <= 1)
    assert abs(row["lin_ccc"]) <= abs(row["pearson_r"]) + 1e-15


def test_bland_altman_matches_numpy(spark):
    from us_flight_bigdata_dashboard_spark.operators.evaluation import (
        q_bland_altman_agreement,
    )

    x, y = _monthly_gross_net()
    d = x - y
    n = len(d)
    mean_d = d.mean()
    sd = math.sqrt(((d - mean_d) ** 2).sum() / (n - 1))
    lo, hi = mean_d - 1.96 * sd, mean_d + 1.96 * sd
    within = int(((d >= lo) & (d <= hi)).sum())
    (row,) = q_bland_altman_agreement(spark, SF_DIR).collect()
    u = 1e7  # $10M units -> dollars
    assert row["n_months"] == n
    assert row["mean_diff_dollars"] == pytest.approx(mean_d * u, rel=1e-9)
    # sd is fsum-quantization-bounded at ~2e-8 relative (scale-12 quantum
    # under ~1e-5-magnitude squared deviations) — documented in the op
    assert row["sd_diff_dollars"] == pytest.approx(sd * u, rel=1e-7)
    assert row["loa_lower_dollars"] == pytest.approx(lo * u, rel=1e-7)
    assert row["loa_upper_dollars"] == pytest.approx(hi * u, rel=1e-7)
    assert row["n_within"] == within


# ---------------------------------------------------------------------------
# goodman_kruskal_gamma — brute force over contingency cells
# ---------------------------------------------------------------------------


def test_gk_gamma_cell_bruteforce(spark):
    from us_flight_bigdata_dashboard_spark.operators.evaluation import (
        GAMMA_QTY_BAND,
        q_goodman_kruskal_gamma,
    )

    od = _df("orders")[["o_orderkey", "o_orderpriority"]]
    li = _df("lineitem")[["l_orderkey", "l_quantity"]]
    j = li.merge(od, left_on="l_orderkey", right_on="o_orderkey")
    x = j["o_orderpriority"].str[0].astype(int).values
    y = np.minimum(2, ((j["l_quantity"] - 1) // GAMMA_QTY_BAND).astype(int)).values
    cells = collections.Counter(zip(x, y))
    c = d = 0
    for (x1, y1), n1 in cells.items():
        for (x2, y2), n2 in cells.items():
            if x1 < x2 and y1 < y2:
                c += n1 * n2
            elif x1 < x2 and y1 > y2:
                d += n1 * n2
    (row,) = q_goodman_kruskal_gamma(spark, SF_DIR).collect()
    assert row["concordant"] == c
    assert row["discordant"] == d
    assert row["gamma"] == pytest.approx((c - d) / (c + d), rel=1e-12)


# ---------------------------------------------------------------------------
# cliffs_delta_effect — O(n1*n2) pair brute force
# ---------------------------------------------------------------------------


def test_cliffs_delta_pair_bruteforce(spark):
    from us_flight_bigdata_dashboard_spark.operators.statistics import (
        q_cliffs_delta_effect,
    )

    li = _df("lineitem")
    ret = li["l_returnflag"] == "R"
    x = li.loc[ret, "l_extendedprice"].values
    y = li.loc[~ret, "l_extendedprice"].values
    gt = int((x[:, None] > y[None, :]).sum())
    lt = int((x[:, None] < y[None, :]).sum())
    tie = len(x) * len(y) - gt - lt
    (row,) = q_cliffs_delta_effect(spark, SF_DIR).collect()
    assert row["n1"] == len(x) and row["n2"] == len(y)
    assert row["gt_pairs"] == gt
    assert row["lt_pairs"] == lt
    assert row["tie_pairs"] == tie
    assert row["cliffs_delta"] == pytest.approx(
        (gt - lt) / (len(x) * len(y)), rel=1e-12
    )


# ---------------------------------------------------------------------------
# cramer_von_mises_two — ECDF brute force
# ---------------------------------------------------------------------------


def test_cvm_matches_ecdf_bruteforce(spark):
    from us_flight_bigdata_dashboard_spark.operators.statistics import (
        q_cramer_von_mises_two,
    )

    od = _df("orders")
    urg = od["o_orderpriority"] == "1-URGENT"
    x = np.sort(od.loc[urg, "o_totalprice"].values)
    y = np.sort(od.loc[~urg, "o_totalprice"].values)
    pooled = np.concatenate([x, y])
    f1 = np.searchsorted(x, pooled, side="right") / len(x)
    f2 = np.searchsorted(y, pooled, side="right") / len(y)
    t = len(x) * len(y) / (len(pooled) ** 2) * ((f1 - f2) ** 2).sum()
    (row,) = q_cramer_von_mises_two(spark, SF_DIR).collect()
    assert row["n1"] == len(x) and row["n2"] == len(y)
    assert row["t_stat"] == pytest.approx(t, rel=1e-9)


# ---------------------------------------------------------------------------
# jonckheere_terpstra — pairwise U brute force
# ---------------------------------------------------------------------------


def test_jonckheere_pairwise_bruteforce(spark):
    from us_flight_bigdata_dashboard_spark.operators.statistics import (
        q_jonckheere_terpstra,
    )

    od = _df("orders")
    g = od["o_orderpriority"].str[0].astype(int).values
    v = od["o_totalprice"].values
    groups = [v[g == k] for k in range(1, 6)]
    two_j = 0
    for i in range(5):
        for j in range(i + 1, 5):
            a, b = groups[i], groups[j]
            two_j += 2 * int((a[:, None] < b[None, :]).sum()) + int(
                (a[:, None] == b[None, :]).sum()
            )
    ns = [len(a) for a in groups]
    n = sum(ns)
    e2j = (n * n - sum(k * k for k in ns)) / 2.0
    # full Hollander-Wolfe tie-corrected variance (r10 ADVICE fix)
    from collections import Counter

    tie = Counter(v.tolist())
    st1 = sum(t * (t - 1) * (2 * t + 5) for t in tie.values())
    st2 = sum(t * (t - 1) * (t - 2) for t in tie.values())
    st3 = sum(t * (t - 1) for t in tie.values())
    sg1 = sum(k * (k - 1) * (2 * k + 5) for k in ns)
    sg2 = sum(k * (k - 1) * (k - 2) for k in ns)
    sg3 = sum(k * (k - 1) for k in ns)
    var_j = (
        (n * (n - 1) * (2 * n + 5) - sg1 - st1) / 72.0
        + (sg2 * st2) / (36.0 * n * (n - 1) * (n - 2))
        + (sg3 * st3) / (8.0 * n * (n - 1))
    )
    z = (two_j - e2j) / (2.0 * math.sqrt(var_j))
    (row,) = q_jonckheere_terpstra(spark, SF_DIR).collect()
    assert row["n_total"] == n
    assert row["two_j"] == two_j
    assert row["expected_two_j"] == pytest.approx(e2j, rel=1e-12)
    assert row["z_stat"] == pytest.approx(z, rel=1e-9)


# ---------------------------------------------------------------------------
# mood_median_test — brute force
# ---------------------------------------------------------------------------


def test_mood_median_bruteforce(spark):
    from us_flight_bigdata_dashboard_spark.operators.statistics import (
        q_mood_median_test,
    )

    li = _df("lineitem")
    v = li["l_extendedprice"].values
    flags = li["l_returnflag"].values
    n = len(v)
    med = np.sort(v)[(n + 1) // 2 - 1]  # type-1 lower median
    chi2 = 0.0
    le_tot = int((v <= med).sum())
    for f in ["A", "N", "R"]:
        sel = flags == f
        ng = int(sel.sum())
        for side_cnt, side_tot in (
            (int((v[sel] <= med).sum()), le_tot),
            (int((v[sel] > med).sum()), n - le_tot),
        ):
            e = ng * side_tot / n
            chi2 += (side_cnt - e) ** 2 / e
    (row,) = q_mood_median_test(spark, SF_DIR).collect()
    assert row["n_total"] == n
    assert row["median_v"] == pytest.approx(med, abs=0)
    assert row["n_le_median"] == le_tot
    assert row["chi2_stat"] == pytest.approx(chi2, rel=1e-9)


# ---------------------------------------------------------------------------
# text_yules_k / text_tv_distance — Counter brute forces
# ---------------------------------------------------------------------------


def _source_token_counts():
    docs = _df("documents")
    per_src: dict = {}
    for src, text in zip(docs["source"], docs["text"]):
        c = per_src.setdefault(src, collections.Counter())
        c.update(t for t in text.lower().split(" ") if t != "")
    return per_src


def test_yules_k_counter(spark):
    from us_flight_bigdata_dashboard_spark.operators.text import q_text_yules_k

    per_src = _source_token_counts()
    rows = {r["source"]: r for r in q_text_yules_k(spark, SF_DIR).collect()}
    assert set(rows) == set(per_src)
    for src, c in per_src.items():
        n = sum(c.values())
        sc2 = sum(v * v for v in c.values())
        k = 1e4 * (sc2 - n) / (n * n)
        assert rows[src]["vocab"] == len(c)
        assert rows[src]["n_tokens"] == n
        assert rows[src]["yules_k"] == pytest.approx(k, rel=1e-12)


def test_tv_distance_counter(spark):
    from us_flight_bigdata_dashboard_spark.operators.text import q_text_tv_distance
    from fractions import Fraction

    per_src = _source_token_counts()
    pooled = collections.Counter()
    for c in per_src.values():
        pooled.update(c)
    n_all = sum(pooled.values())
    rows = {r["source"]: r for r in q_text_tv_distance(spark, SF_DIR).collect()}
    for src, c in per_src.items():
        n_src = sum(c.values())
        tv = Fraction(0)
        for t in pooled:
            p = Fraction(c.get(t, 0), n_src)
            q = Fraction(pooled[t], n_all)
            tv += abs(p - q)
        tv = tv / 2
        assert rows[src]["n_src"] == n_src
        assert rows[src]["tv_distance"] == pytest.approx(float(tv), rel=1e-9)
        assert 0.0 <= rows[src]["tv_distance"] <= 1.0


# ---------------------------------------------------------------------------
# gini_split_gain — stump brute force
# ---------------------------------------------------------------------------


def test_gini_split_bruteforce(spark):
    from us_flight_bigdata_dashboard_spark.operators.evaluation import (
        q_gini_split_gain,
    )

    li = _df("lineitem")
    disc = np.round(li["l_discount"] * 100).astype(int).values
    pos = (li["l_returnflag"] == "R").values.astype(int)
    n, p = len(disc), int(pos.sum())

    def gini(p_, n_):
        r = p_ / n_
        return 2.0 * r * (1.0 - r)

    root = gini(p, n)
    best_gain, best_thr = -1.0, None
    expected = {}
    for thr in sorted(set(disc)):
        left = disc <= thr
        nl, pl = int(left.sum()), int(pos[left].sum())
        if nl == n:
            continue
        gain = root - nl / n * gini(pl, nl) - (n - nl) / n * gini(p - pl, n - nl)
        expected[thr] = (nl, pl, gain)
        if gain > best_gain + 1e-18:
            best_gain, best_thr = gain, thr
    rows = q_gini_split_gain(spark, SF_DIR).collect()
    assert len(rows) == len(expected)
    for r in rows:
        nl, pl, gain = expected[r["disc_pct"]]
        assert r["n_left"] == nl and r["pos_left"] == pl
        assert r["gini_gain"] == pytest.approx(gain, rel=1e-9, abs=1e-15)
        assert r["is_best"] == int(r["disc_pct"] == best_thr)


# ---------------------------------------------------------------------------
# sketch_theta_difference — exact-mode collapse
# ---------------------------------------------------------------------------


def test_theta_difference_exact_mode(spark):
    from us_flight_bigdata_dashboard_spark.operators.sketches import (
        THETA_FULL,
        THETA_K,
        q_sketch_theta_difference,
    )

    od = _df("orders")
    a = set(od.loc[od["o_orderpriority"] == "1-URGENT", "o_custkey"])
    b = set(od.loc[od["o_orderpriority"] == "2-HIGH", "o_custkey"])
    (row,) = q_sketch_theta_difference(spark, SF_DIR).collect()
    assert row["exact_diff"] == len(a - b)
    if len(a) < THETA_K and len(b) < THETA_K:
        assert row["theta"] == THETA_FULL
        assert row["n_only"] == len(a - b)
        assert row["theta_est"] == pytest.approx(float(len(a - b)))
        assert row["rel_err_pct"] == pytest.approx(0.0, abs=1e-9)


# ---------------------------------------------------------------------------
# recursive_cte_drain — Python re-simulation
# ---------------------------------------------------------------------------


def test_recursive_drain_python_sim(spark):
    from us_flight_bigdata_dashboard_spark.operators.relational import (
        DRAIN_MAX_MONTHS,
        DRAIN_MIN_PAY_CENTS,
        q_recursive_cte_drain,
    )

    od = _df("orders")
    cust = _df("customer")[["c_custkey", "c_nationkey"]]
    nat = _df("nation")[["n_nationkey", "n_regionkey"]]
    reg = _df("region")[["r_regionkey", "r_name"]]
    j = (
        od[od["o_orderstatus"] == "O"]
        .merge(cust, left_on="o_custkey", right_on="c_custkey")
        .merge(nat, left_on="c_nationkey", right_on="n_nationkey")
        .merge(reg, left_on="n_regionkey", right_on="r_regionkey")
    )
    j["cents"] = np.round(j["o_totalprice"] * 100).astype(np.int64)
    opening = j.groupby("r_name")["cents"].sum().to_dict()
    expected = []
    for r_name, bal in opening.items():
        bal = int(bal)
        expected.append((r_name, 0, bal))
        month = 0
        while month < DRAIN_MAX_MONTHS and bal > 0:
            bal = max(bal - max(bal // 4, DRAIN_MIN_PAY_CENTS), 0)
            month += 1
            expected.append((r_name, month, bal))
    expected.sort()
    rows = [
        (r["region_name"], r["month_n"], r["balance_cents"])
        for r in q_recursive_cte_drain(spark, SF_DIR).collect()
    ]
    assert rows == expected
    # every region must reach zero inside the cap at this SF
    finals = {}
    for r_name, _, bal in rows:
        finals[r_name] = bal
    assert all(v == 0 for v in finals.values())


# ---------------------------------------------------------------------------
# lateral_join_topk — pandas top-k re-derivation
# ---------------------------------------------------------------------------


def test_lateral_topk_matches_pandas(spark):
    from us_flight_bigdata_dashboard_spark.operators.relational import (
        LATERAL_TOPK,
        q_lateral_join_topk,
    )

    od = _df("orders")
    cust = _df("customer")[["c_custkey", "c_nationkey"]]
    nat = _df("nation")[["n_nationkey", "n_name"]]
    od["cents"] = np.round(od["o_totalprice"] * 100).astype(np.int64)
    rev = (
        od.groupby("o_custkey")["cents"]
        .sum()
        .reset_index()
        .merge(cust, left_on="o_custkey", right_on="c_custkey")
        .merge(nat, left_on="c_nationkey", right_on="n_nationkey")
    )
    expected = []
    for n_name, grp in rev.groupby("n_name"):
        top = grp.sort_values(
            ["cents", "c_custkey"], ascending=[False, True]
        ).head(LATERAL_TOPK)
        for _, r in top.iterrows():
            expected.append((n_name, int(r["c_custkey"]), int(r["cents"])))
    rows = [
        (r["nation_name"], r["c_custkey"], r["rev_cents"])
        for r in q_lateral_join_topk(spark, SF_DIR).collect()
    ]
    assert sorted(rows) == sorted(expected)


# ---------------------------------------------------------------------------
# streaming_late_data_replay — drop/absorb/flush semantics
# ---------------------------------------------------------------------------


def test_late_data_replay_semantics(spark):
    from us_flight_bigdata_dashboard_spark.streaming.replay import (
        _LATE_ANCIENT_H,
        q_streaming_late_data_replay,
    )

    rows = q_streaming_late_data_replay(spark, SF_DIR).collect()
    # (1) the future sentinel's window must never emit
    assert all(r["event_type"] != "sentinel" for r in rows)
    ev = _df("events").dropna(subset=["ts"])
    tmin = ev["ts"].min()
    gm = ev["ts"].max()
    # (2) exactly-once emission: (window, type) keys are unique
    keys = [(r["window_start"], r["event_type"]) for r in rows]
    assert len(keys) == len(set(keys))
    # (3) far-late rows were dropped: first-day totals equal the batch
    # count MINUS the even-event_id slice
    first_day = ev[ev["ts"] < tmin + np.timedelta64(_LATE_ANCIENT_H, "h")]
    cutoff = tmin + np.timedelta64(_LATE_ANCIENT_H, "h")
    kept = ev[
        ~((ev["ts"] < cutoff) & (ev["event_id"] % 2 == 0))
    ]
    expect_first_day = int((kept["ts"].dt.floor("h") < cutoff).sum())
    got_first_day = sum(
        r["n_events"] for r in rows if r["window_start"] < cutoff
    )
    assert got_first_day == expect_first_day
    # (4) late-but-inside-horizon rows were absorbed: the final hours'
    # totals equal the FULL batch count (nothing lost at the tail)
    total = sum(r["n_events"] for r in rows)
    assert total == len(ev) - int((first_day["event_id"] % 2 == 0).sum())
    # and the last real event's window is present
    last_ws = gm.floor("h")
    assert any(r["window_start"] == last_ws for r in rows)


# ---------------------------------------------------------------------------
# icc_oneway — one-way ANOVA brute force on the zero-filled grid
# ---------------------------------------------------------------------------


def test_icc_oneway_bruteforce(spark):
    from us_flight_bigdata_dashboard_spark.operators.evaluation import (
        ICC_K,
        ICC_YEAR,
        q_icc_oneway,
    )

    od = _df("orders")
    cust = _df("customer")[["c_custkey", "c_nationkey"]]
    nat = _df("nation")[["n_nationkey"]]
    od = od[od["o_orderdate"].dt.year == ICC_YEAR].merge(
        cust, left_on="o_custkey", right_on="c_custkey"
    )
    od["cents"] = np.round(od["o_totalprice"] * 100).astype(np.int64)
    od["mth"] = od["o_orderdate"].dt.month
    grid = np.zeros((len(nat), ICC_K))
    idx = {nk: i for i, nk in enumerate(nat["n_nationkey"])}
    for (nk, mth), cents in od.groupby(["c_nationkey", "mth"])["cents"].sum().items():
        grid[idx[nk], mth - 1] = cents / 1e9
    n, k = grid.shape
    means = grid.mean(axis=1)
    gmean = grid.mean()
    ssb = k * ((means - gmean) ** 2).sum()
    ssw = ((grid - means[:, None]) ** 2).sum()
    msb = ssb / (n - 1)
    msw = ssw / (n * (k - 1))
    icc1 = (msb - msw) / (msb + (k - 1) * msw)
    (row,) = q_icc_oneway(spark, SF_DIR).collect()
    assert row["n_groups"] == n and row["k_raters"] == k
    # the sums of squares are fsum-quantization-bounded at ~1e-8
    # relative at sf0.001 (tiny deviations under the scale-12 quantum;
    # documented in the op) — same precedent as bland_altman's sd
    assert row["ms_between"] == pytest.approx(msb, rel=1e-7)
    assert row["ms_within"] == pytest.approx(msw, rel=1e-7)
    assert row["icc1"] == pytest.approx(icc1, rel=1e-6)
    assert row["icc_k"] == pytest.approx((msb - msw) / msb, rel=1e-6)


# ---------------------------------------------------------------------------
# stuart_maxwell_test — brute force on the paired tercile table
# ---------------------------------------------------------------------------


def _tercile(series_rev):
    # competition rank desc with custkey tie-break, tercile = floor(3(r-1)/n)
    import pandas as pd

    df = series_rev.reset_index()
    df.columns = ["cust", "rev"]
    df = df.sort_values(["rev", "cust"], ascending=[False, True]).reset_index(
        drop=True
    )
    n = len(df)
    df["cat"] = (3 * df.index // n).astype(int)
    return dict(zip(df["cust"], df["cat"]))


def test_stuart_maxwell_bruteforce(spark):
    from us_flight_bigdata_dashboard_spark.operators.evaluation import (
        SM_YEAR_A,
        SM_YEAR_B,
        q_stuart_maxwell_test,
    )

    od = _df("orders")
    od["cents"] = np.round(od["o_totalprice"] * 100).astype(np.int64)
    ra = _tercile(
        od[od["o_orderdate"].dt.year == SM_YEAR_A].groupby("o_custkey")["cents"].sum()
    )
    rb = _tercile(
        od[od["o_orderdate"].dt.year == SM_YEAR_B].groupby("o_custkey")["cents"].sum()
    )
    n = np.zeros((3, 3), dtype=np.int64)
    for cust, ca in ra.items():
        if cust in rb:
            n[ca, rb[cust]] += 1
    d = n.sum(axis=1) - n.sum(axis=0)
    v11 = n.sum(axis=1)[0] + n.sum(axis=0)[0] - 2 * n[0, 0]
    v22 = n.sum(axis=1)[1] + n.sum(axis=0)[1] - 2 * n[1, 1]
    v12 = -(n[0, 1] + n[1, 0])
    chi2 = (d[0] ** 2 * v22 + d[1] ** 2 * v11 - 2 * d[0] * d[1] * v12) / (
        v11 * v22 - v12 * v12
    )
    (row,) = q_stuart_maxwell_test(spark, SF_DIR).collect()
    assert row["n_paired"] == int(n.sum())
    assert row["d_low"] == d[0] and row["d_mid"] == d[1]
    assert row["chi2_stat"] == pytest.approx(chi2, rel=1e-12)


# ---------------------------------------------------------------------------
# krippendorff_alpha — brute force from the rating grid
# ---------------------------------------------------------------------------


def _nation_quarter_cats(year, k_cats=3):
    od = _df("orders")
    cust = _df("customer")[["c_custkey", "c_nationkey"]]
    nat = sorted(_df("nation")["n_nationkey"])
    od = od[od["o_orderdate"].dt.year == year].merge(
        cust, left_on="o_custkey", right_on="c_custkey"
    )
    od["cents"] = np.round(od["o_totalprice"] * 100).astype(np.int64)
    od["q"] = od["o_orderdate"].dt.quarter
    rev = od.groupby(["c_nationkey", "q"])["cents"].sum().to_dict()
    cats = {}
    for q in (1, 2, 3, 4):
        vals = sorted(
            ((-(rev.get((nk, q), 0)), nk) for nk in nat)
        )  # desc rev, asc nk
        n = len(vals)
        for r, (_, nk) in enumerate(vals):
            cats[(nk, q)] = k_cats * r // n
    return nat, cats


def test_krippendorff_alpha_bruteforce(spark):
    from us_flight_bigdata_dashboard_spark.operators.inference import (
        KRIPP_M,
        KRIPP_YEAR,
        q_krippendorff_alpha,
    )

    nat, cats = _nation_quarter_cats(KRIPP_YEAR)
    m = KRIPP_M
    do_num = 0
    n_c = collections.Counter()
    for nk in nat:
        cnt = collections.Counter(cats[(nk, q)] for q in (1, 2, 3, 4))
        for c, v in cnt.items():
            do_num += v * (m - v)
            n_c[c] += v
    n_total = m * len(nat)
    d_o = do_num / (n_total * (m - 1))
    d_e = sum(v * (n_total - v) for v in n_c.values()) / (n_total * (n_total - 1))
    (row,) = q_krippendorff_alpha(spark, SF_DIR).collect()
    assert row["n_units"] == len(nat)
    assert row["n_total"] == n_total
    assert row["d_observed"] == pytest.approx(d_o, rel=1e-12)
    assert row["d_expected"] == pytest.approx(d_e, rel=1e-12)
    assert row["alpha"] == pytest.approx(1 - d_o / d_e, rel=1e-12)


# ---------------------------------------------------------------------------
# quade_test — scipy-free brute force (midranks + range weights)
# ---------------------------------------------------------------------------


def test_quade_bruteforce(spark):
    from us_flight_bigdata_dashboard_spark.operators.inference import (
        QUADE_YEAR,
        q_quade_test,
    )

    od = _df("orders")
    cust = _df("customer")[["c_custkey", "c_nationkey"]]
    nat = sorted(_df("nation")["n_nationkey"])
    od = od[od["o_orderdate"].dt.year == QUADE_YEAR].merge(
        cust, left_on="o_custkey", right_on="c_custkey"
    )
    od["cents"] = np.round(od["o_totalprice"] * 100).astype(np.int64)
    od["q"] = od["o_orderdate"].dt.quarter
    rev = od.groupby(["c_nationkey", "q"])["cents"].sum().to_dict()
    grid = np.array(
        [[rev.get((nk, q), 0) for q in (1, 2, 3, 4)] for nk in nat], dtype=float
    )

    def midranks(a):
        order = np.argsort(a, kind="stable")
        r = np.empty(len(a))
        i = 0
        s = a[order]
        while i < len(a):
            j = i
            while j + 1 < len(a) and s[j + 1] == s[i]:
                j += 1
            r[order[i : j + 1]] = (i + j) / 2 + 1
            i = j + 1
        return r

    b, k = grid.shape
    r = np.vstack([midranks(row) for row in grid])
    rng = grid.max(axis=1) - grid.min(axis=1)
    q_w = midranks(rng)
    s = q_w[:, None] * (r - (k + 1) / 2)
    a_stat = (s**2).sum()
    b_stat = (s.sum(axis=0) ** 2).sum() / b
    f = (b - 1) * b_stat / (a_stat - b_stat)
    (row,) = q_quade_test(spark, SF_DIR).collect()
    assert row["n_blocks"] == b and row["k_treatments"] == k
    assert row["f_stat"] == pytest.approx(f, rel=1e-12)


# ---------------------------------------------------------------------------
# ansari_bradley_scale — brute-force folded scores + permutation moments
# ---------------------------------------------------------------------------


def test_ansari_bradley_bruteforce(spark):
    from us_flight_bigdata_dashboard_spark.operators.statistics import (
        q_ansari_bradley_scale,
    )

    od = _df("orders")
    urg = (od["o_orderpriority"] == "1-URGENT").values
    v = od["o_totalprice"].values
    order = np.argsort(v, kind="stable")
    n = len(v)
    pos = np.arange(1, n + 1, dtype=float)
    raw = np.minimum(pos, n + 1 - pos)
    # tie-average the folded scores
    s_sorted = v[order]
    scores = np.empty(n)
    i = 0
    while i < n:
        j = i
        while j + 1 < n and s_sorted[j + 1] == s_sorted[i]:
            j += 1
        scores[i : j + 1] = raw[i : j + 1].mean()
        i = j + 1
    score_of = np.empty(n)
    score_of[order] = scores
    w = score_of[urg].sum()
    n1, n2 = int(urg.sum()), int((~urg).sum())
    ubar = scores.mean()
    var_pop = scores.var()
    var_w = n1 * n2 / (n - 1) * var_pop
    z = (w - n1 * ubar) / math.sqrt(var_w)
    (row,) = q_ansari_bradley_scale(spark, SF_DIR).collect()
    assert row["n1"] == n1 and row["n2"] == n2
    # w_norm is fsum-quantization-bounded (~1e-8 relative, scale-8 quantum)
    assert row["w2_doubled"] == pytest.approx(2 * w, rel=1e-7)
    assert row["expected_w2"] == pytest.approx(2 * n1 * ubar, rel=1e-9)
    # z's numerator is a small difference of O(100) sums, so the scale-8
    # quantization bias amplifies — bound measured at ~1e-6 relative
    assert row["z_stat"] == pytest.approx(z, rel=1e-5)


# ---------------------------------------------------------------------------
# clustering_silhouette — invariants + brute-force recomputation
# ---------------------------------------------------------------------------


def test_clustering_silhouette_bruteforce(spark):
    from us_flight_bigdata_dashboard_spark.operators.similarity import (
        q_clustering_silhouette,
        train_ivf_centroids,
    )

    emb = _df("embeddings")
    centroids = np.array(train_ivf_centroids(spark, SF_DIR))
    cn = np.linalg.norm(centroids, axis=1)
    sums = {}
    counts = {}
    for vec in emb["embedding"]:
        v = np.array(vec, dtype=np.float64)
        sims = centroids @ v / (cn * np.linalg.norm(v))
        order = np.sort(sims)[::-1]
        a, b = 1 - order[0], 1 - order[1]
        s = 0.0 if max(a, b) <= 0 else (b - a) / max(a, b)
        cid = int(np.argmax(sims))
        sums[cid] = sums.get(cid, 0.0) + s
        counts[cid] = counts.get(cid, 0) + 1
    rows = {r["centroid_id"]: r for r in q_clustering_silhouette(spark, SF_DIR).collect()}
    assert set(rows) == set(counts)
    for cid in counts:
        assert rows[cid]["n_members"] == counts[cid]
        assert rows[cid]["mean_silhouette"] == pytest.approx(
            sums[cid] / counts[cid], rel=1e-6, abs=1e-9
        )
        assert -1.0 - 1e-12 <= rows[cid]["mean_silhouette"] <= 1.0 + 1e-12


# ---------------------------------------------------------------------------
# neyman_allocation — textbook identity checks
# ---------------------------------------------------------------------------


def test_neyman_allocation_identities(spark):
    from us_flight_bigdata_dashboard_spark.operators.sampling import (
        NEYMAN_BUDGET,
        q_neyman_allocation,
    )

    od = _df("orders")
    od["cents"] = np.round(od["o_totalprice"] * 100).astype(np.int64)
    rows = q_neyman_allocation(spark, SF_DIR).collect()
    # allocations both sum to the budget
    # sums carry the fsum floor-quantization bias (~1e-7 relative)
    assert sum(r["neyman_n"] for r in rows) == pytest.approx(NEYMAN_BUDGET, rel=1e-6)
    assert sum(r["proportional_n"] for r in rows) == pytest.approx(
        NEYMAN_BUDGET, rel=1e-9
    )
    for r in rows:
        grp = od[od["o_orderpriority"] == r["stratum"]]
        x = grp["cents"].values / 1e9
        assert r["n_h"] == len(grp)
        sd = x.std(ddof=1)
        assert r["stratum_sd_dollars"] == pytest.approx(sd * 1e7, rel=1e-6)
    # Neyman beats (or ties) proportional: variance ratio >= 1
    assert rows[0]["variance_ratio_prop_vs_neyman"] >= 1.0 - 1e-12
    # textbook n_h proportional to N_h * S_h
    w = [(r["n_h"] * r["stratum_sd_dollars"]) for r in rows]
    for r, wi in zip(rows, w):
        assert r["neyman_n"] / NEYMAN_BUDGET == pytest.approx(
            wi / sum(w), rel=1e-6
        )


# ---------------------------------------------------------------------------
# eoq_batch_sizing — closed-form identities
# ---------------------------------------------------------------------------


def test_eoq_identities(spark):
    from us_flight_bigdata_dashboard_spark.operators.decision import (
        EOQ_HOLDING_RATE,
        EOQ_SETUP_COST,
        q_eoq_batch_sizing,
    )

    rows = q_eoq_batch_sizing(spark, SF_DIR).collect()
    assert len(rows) > 0
    for r in rows:
        d, p, q = r["annual_demand"], r["mean_unit_price"], r["eoq_units"]
        h = EOQ_HOLDING_RATE * p
        assert q == pytest.approx(math.sqrt(2 * d * EOQ_SETUP_COST / h), rel=1e-12)
        # at the EOQ, ordering cost equals holding cost (the defining identity)
        ordering = d / q * EOQ_SETUP_COST
        holding = q / 2 * h
        assert ordering == pytest.approx(holding, rel=1e-9)
        assert r["total_relevant_cost"] == pytest.approx(
            ordering + holding, rel=1e-9
        )


# ---------------------------------------------------------------------------
# events_page_hinkley — sequential Python re-simulation
# ---------------------------------------------------------------------------


def test_page_hinkley_sequential_sim(spark):
    from us_flight_bigdata_dashboard_spark.operators.events import (
        PH_DELTA,
        PH_LAMBDA,
        _PH_FP,
        q_events_page_hinkley,
    )

    ev = _df("events").dropna(subset=["ts"]).sort_values(["event_type", "ts", "event_id"])
    rows = {r["event_type"]: r for r in q_events_page_hinkley(spark, SF_DIR).collect()}
    for etype, grp in ev.groupby("event_type"):
        # exact decimal(28,8) prefix like both engines
        from decimal import Decimal

        prefix = Decimal(0)
        m = 0
        m_min = 0
        max_e = 0
        n_rows_above = 0
        n_alarms = 0  # distinct up-crossings (r10 ADVICE fix)
        prev_above = False
        first_alarm = None
        lam_fp = int(PH_LAMBDA * _PH_FP)
        for i, (x, ts) in enumerate(zip(grp["value"], grp["ts"]), start=1):
            prefix += Decimal(repr(float(x))).quantize(Decimal("1.00000000"))
            c = float(x) - float(prefix) / i - PH_DELTA
            m += math.floor(c * _PH_FP)
            m_min = min(m_min, m)
            e = m - m_min
            max_e = max(max_e, e)
            above = e > lam_fp
            if above:
                n_rows_above += 1
                if not prev_above:
                    n_alarms += 1
                if first_alarm is None:
                    first_alarm = ts
            prev_above = above
        r = rows[etype]
        assert r["n"] == len(grp)
        assert r["n_alarms"] == n_alarms
        assert r["n_rows_above_lambda"] == n_rows_above
        assert r["max_excursion"] == pytest.approx(max_e / _PH_FP, rel=1e-12)
        if first_alarm is not None:
            assert r["first_alarm_ts"] == first_alarm
        else:
            assert r["first_alarm_ts"] is None


# ---------------------------------------------------------------------------
# davies_bouldin_index — brute-force recomputation
# ---------------------------------------------------------------------------


def test_davies_bouldin_bruteforce(spark):
    from us_flight_bigdata_dashboard_spark.operators.similarity import (
        q_davies_bouldin_index,
        train_ivf_centroids,
    )

    emb = _df("embeddings")
    centroids = np.array(train_ivf_centroids(spark, SF_DIR))
    cn = np.linalg.norm(centroids, axis=1)
    sums, counts = {}, {}
    for vec in emb["embedding"]:
        v = np.array(vec, dtype=np.float64)
        sims = centroids @ v / (cn * np.linalg.norm(v))
        cid = int(np.argmax(sims))
        sums[cid] = sums.get(cid, 0.0) + (1 - sims.max())
        counts[cid] = counts.get(cid, 0) + 1
    sigma = {c: sums[c] / counts[c] for c in counts}
    k = len(centroids)
    d = 1 - (centroids @ centroids.T) / np.outer(cn, cn)
    rows = {r["centroid_id"]: r for r in q_davies_bouldin_index(spark, SF_DIR).collect()}
    r_vals = {}
    for i in sorted(sigma):
        ratios = [
            ((sigma[i] + sigma[j]) / d[i, j], j)
            for j in sorted(sigma)
            if j != i
        ]
        best = max(ratios, key=lambda t: (t[0], -t[1]))
        r_vals[i] = best[0]
        assert rows[i]["n_members"] == counts[i]
        assert rows[i]["sigma"] == pytest.approx(sigma[i], rel=1e-6)
        assert rows[i]["r_i"] == pytest.approx(best[0], rel=1e-6)
    db = sum(r_vals.values()) / len(r_vals)
    assert rows[0]["db_index"] == pytest.approx(db, rel=1e-6)


# ---------------------------------------------------------------------------
# partial_correlation — numpy closed-form recomputation
# ---------------------------------------------------------------------------


def test_partial_correlation_numpy(spark):
    from us_flight_bigdata_dashboard_spark.operators.statistics import (
        q_partial_correlation,
    )

    li = _df("lineitem")
    x = li["l_quantity"].values.astype(np.float64)
    y = li["l_extendedprice"].values.astype(np.float64)
    z = li["l_discount"].values.astype(np.float64)

    def r(a, b):
        return np.corrcoef(a, b)[0, 1]

    r_xy, r_xz, r_yz = r(x, y), r(x, z), r(y, z)
    partial = (r_xy - r_xz * r_yz) / math.sqrt((1 - r_xz**2) * (1 - r_yz**2))
    (row,) = q_partial_correlation(spark, SF_DIR).collect()
    assert row["n_rows"] == len(x)
    assert row["r_qty_price"] == pytest.approx(r_xy, rel=1e-7)
    assert row["r_qty_discount"] == pytest.approx(r_xz, rel=1e-6, abs=1e-9)
    assert row["r_price_discount"] == pytest.approx(r_yz, rel=1e-6, abs=1e-9)
    assert row["partial_r_qty_price_given_discount"] == pytest.approx(
        partial, rel=1e-6, abs=1e-9
    )


# ---------------------------------------------------------------------------
# forecast_pinball_loss / forecast_tracking_signal — brute forces
# ---------------------------------------------------------------------------


def test_pinball_loss_bruteforce(spark):
    from us_flight_bigdata_dashboard_spark.operators.events import (
        FMASE_SEASON,
        q_forecast_pinball_loss,
    )

    ev = _df("events").dropna(subset=["ts"])
    ev["day"] = ev["ts"].dt.normalize()
    daily = ev.groupby(["event_type", "day"]).size()
    rows = {
        (r["event_type"], r["quantile_pct"]): r
        for r in q_forecast_pinball_loss(spark, SF_DIR).collect()
    }
    import pandas as pd

    for qq in (50, 90):
        q = qq / 100.0
        for etype in ev["event_type"].unique():
            s = daily[etype]
            losses = []
            for day, actual in s.items():
                fday = day - pd.Timedelta(days=FMASE_SEASON)
                if fday in s.index:
                    d = actual - s[fday]
                    losses.append(max(q * d, (q - 1) * d))
            r = rows[(etype, qq)]
            assert r["n_eval_days"] == len(losses)
            assert r["mean_pinball_loss"] == pytest.approx(
                sum(losses) / len(losses), rel=1e-12
            )


def test_tracking_signal_bruteforce(spark):
    from us_flight_bigdata_dashboard_spark.operators.events import (
        TS_CONTROL_LIMIT,
        q_forecast_tracking_signal,
    )

    ev = _df("events").dropna(subset=["ts"])
    ev["day"] = ev["ts"].dt.normalize()
    daily = ev.groupby(["event_type", "day"]).size()
    rows = {
        r["event_type"]: r
        for r in q_forecast_tracking_signal(spark, SF_DIR).collect()
    }
    import pandas as pd

    for etype in ev["event_type"].unique():
        s = daily[etype].sort_index()
        cfe = sae = t = 0
        final_ts = None
        max_abs = None
        out = 0
        for day, actual in s.items():
            prev_day = day - pd.Timedelta(days=1)
            if prev_day not in s.index:
                continue
            e = int(actual - s[prev_day])
            t += 1
            cfe += e
            sae += abs(e)
            ts = cfe * t / sae if sae > 0 else None
            final_ts = ts
            if ts is not None:
                max_abs = abs(ts) if max_abs is None else max(max_abs, abs(ts))
                if abs(ts) > TS_CONTROL_LIMIT:
                    out = 1
        r = rows[etype]
        assert r["n_periods"] == t
        if final_ts is None:
            assert r["final_ts"] is None
        else:
            assert r["final_ts"] == pytest.approx(final_ts, rel=1e-12)
        assert r["max_abs_ts"] == pytest.approx(max_abs, rel=1e-12)
        assert r["ever_out_of_control"] == out


# ---------------------------------------------------------------------------
# text_gries_dp / text_burstiness_fano — Counter brute forces
# ---------------------------------------------------------------------------


def test_gries_dp_counter(spark):
    from us_flight_bigdata_dashboard_spark.operators.text import (
        DISP_TOP_WORDS,
        q_text_gries_dp,
    )
    from fractions import Fraction

    per_src = _source_token_counts()
    pooled = collections.Counter()
    for c in per_src.values():
        pooled.update(c)
    n_all = sum(pooled.values())
    n_s = {s: sum(c.values()) for s, c in per_src.items()}
    top = sorted(pooled.items(), key=lambda kv: (-kv[1], kv[0]))[:DISP_TOP_WORDS]
    rows = {r["word"]: r for r in q_text_gries_dp(spark, SF_DIR).collect()}
    assert set(rows) == {w for w, _ in top}
    for w, c_w in top:
        dp = Fraction(0)
        for s in per_src:
            v = Fraction(per_src[s].get(w, 0), c_w)
            e = Fraction(n_s[s], n_all)
            dp += abs(v - e)
        dp /= 2
        assert rows[w]["c_w"] == c_w
        assert rows[w]["gries_dp"] == pytest.approx(float(dp), rel=1e-9)
        assert 0.0 <= rows[w]["gries_dp"] <= 1.0


def test_fano_counter(spark):
    from us_flight_bigdata_dashboard_spark.operators.text import (
        DISP_TOP_WORDS,
        q_text_burstiness_fano,
    )

    docs = _df("documents")
    d = len(docs)
    per_doc: dict = {}
    pooled = collections.Counter()
    for doc_id, text in zip(docs["doc_id"], docs["text"]):
        c = collections.Counter(t for t in text.lower().split(" ") if t != "")
        per_doc[doc_id] = c
        pooled.update(c)
    top = sorted(pooled.items(), key=lambda kv: (-kv[1], kv[0]))[:DISP_TOP_WORDS]
    rows = {r["word"]: r for r in q_text_burstiness_fano(spark, SF_DIR).collect()}
    for w, c_w in top:
        counts = np.array([per_doc[i].get(w, 0) for i in per_doc], dtype=np.float64)
        fano = counts.var() / counts.mean()
        r = rows[w]
        assert r["c_w"] == c_w
        assert r["n_docs_with"] == int((counts > 0).sum())
        assert r["fano_factor"] == pytest.approx(fano, rel=1e-9)
        assert d == len(counts)


# ---------------------------------------------------------------------------
# asof_join_tolerance — consistency with the nearest join + bound
# ---------------------------------------------------------------------------


def test_asof_tolerance_consistent_with_nearest(spark):
    from us_flight_bigdata_dashboard_spark.operators.temporal import (
        ASOF_TOL_US,
        q_asof_join_nearest,
        q_asof_join_tolerance,
    )

    near = {r["click_event_id"]: r for r in q_asof_join_nearest(spark, SF_DIR).collect()}
    tol = q_asof_join_tolerance(spark, SF_DIR).collect()
    assert len(tol) == len(near)
    n_in = n_out = 0
    for r in tol:
        nr = near[r["click_event_id"]]
        if nr["gap_us"] is not None and nr["gap_us"] <= ASOF_TOL_US:
            n_in += 1
            assert r["within_tolerance"] == 1
            assert r["view_event_id"] == nr["nearest_view_event_id"]
            assert r["gap_us"] == nr["gap_us"]
        else:
            n_out += 1
            assert r["within_tolerance"] == 0
            assert r["view_event_id"] is None and r["gap_us"] is None
    assert n_in > 0  # the bound is meaningful at this SF


# ---------------------------------------------------------------------------
# embedding_isotropy — numpy recomputation + bounds
# ---------------------------------------------------------------------------


def test_embedding_isotropy_numpy(spark):
    from us_flight_bigdata_dashboard_spark.operators.similarity import (
        q_embedding_isotropy,
    )

    emb = np.array([list(v) for v in _df("embeddings")["embedding"]], dtype=np.float64)
    centroid_norm = np.linalg.norm(emb.sum(axis=0)) / len(emb)
    mean_norm = np.linalg.norm(emb, axis=1).mean()
    (row,) = q_embedding_isotropy(spark, SF_DIR).collect()
    assert row["n_vectors"] == len(emb) and row["n_dims"] == emb.shape[1]
    assert row["centroid_norm"] == pytest.approx(centroid_norm, rel=1e-7)
    assert row["mean_norm"] == pytest.approx(mean_norm, rel=1e-7)
    assert row["anisotropy_ratio"] == pytest.approx(
        centroid_norm / mean_norm, rel=1e-6
    )
    # Cauchy-Schwarz: the ratio is inside [0, 1]
    assert 0.0 <= row["anisotropy_ratio"] <= 1.0 + 1e-12


# ---------------------------------------------------------------------------
# jarque_bera_normality / dixon_q_outlier — numpy brute forces
# ---------------------------------------------------------------------------


def test_jarque_bera_numpy(spark):
    from us_flight_bigdata_dashboard_spark.operators.statistics import (
        q_jarque_bera_normality,
    )

    od = _df("orders")
    x = np.round(od["o_totalprice"] * 100).astype(np.int64).values / 1e9
    n = len(x)
    d = x - x.mean()
    m2, m3, m4 = (d**2).mean(), (d**3).mean(), (d**4).mean()
    skew = m3 / m2**1.5
    kurt = m4 / m2**2
    jb = n / 6 * (skew**2 + (kurt - 3) ** 2 / 4)
    (row,) = q_jarque_bera_normality(spark, SF_DIR).collect()
    assert row["n"] == n
    # skew is near zero here (near-symmetric data): the fsum quantum on
    # the cancelling third-moment sum bounds it absolutely, not relatively
    assert row["skewness"] == pytest.approx(skew, rel=1e-5, abs=1e-8)
    assert row["excess_kurtosis"] == pytest.approx(kurt - 3, rel=1e-7)
    assert row["jb_stat"] == pytest.approx(jb, rel=1e-6)
    assert row["non_normal_5pct"] == int(jb > 5.991465)


def test_dixon_q_bruteforce(spark):
    from us_flight_bigdata_dashboard_spark.operators.evaluation import (
        DIXON_N,
        DIXON_Q_CRIT_N25,
        DIXON_YEAR,
        q_dixon_q_outlier,
    )

    od = _df("orders")
    cust = _df("customer")[["c_custkey", "c_nationkey"]]
    nat = _df("nation")[["n_nationkey", "n_name"]]
    od = od[od["o_orderdate"].dt.year == DIXON_YEAR].merge(
        cust, left_on="o_custkey", right_on="c_custkey"
    )
    od["cents"] = np.round(od["o_totalprice"] * 100).astype(np.int64)
    rev = od.groupby("c_nationkey")["cents"].sum().to_dict()
    vals = sorted(
        ((int(rev.get(nk, 0)), name) for nk, name in zip(nat["n_nationkey"], nat["n_name"])),
        key=lambda t: (-t[0], t[1]),
    )
    x1, x2, xn = vals[0][0], vals[1][0], vals[-1][0]
    q = (x1 - x2) / (x1 - xn)
    (row,) = q_dixon_q_outlier(spark, SF_DIR).collect()
    assert row["n"] == len(vals) == DIXON_N
    assert row["top_nation"] == vals[0][1]
    assert row["q_stat"] == pytest.approx(q, rel=1e-12)
    assert row["is_outlier_5pct"] == int(q > DIXON_Q_CRIT_N25)


# ---------------------------------------------------------------------------
# fill_rate_curve / horvitz_thompson — brute forces
# ---------------------------------------------------------------------------


def test_fill_rate_bruteforce(spark):
    from us_flight_bigdata_dashboard_spark.operators.decision import (
        FILL_PCTS,
        q_fill_rate_curve,
    )

    li = _df("lineitem")
    part = _df("part")[["p_partkey", "p_brand"]]
    j = li.merge(part, left_on="l_partkey", right_on="p_partkey")
    rows = {
        (r["p_brand"], r["stock_percentile"]): r
        for r in q_fill_rate_curve(spark, SF_DIR).collect()
    }
    for brand, grp in j.groupby("p_brand"):
        d = np.sort(grp["l_quantity"].astype(np.int64).values)
        n = len(d)
        for p in FILL_PCTS:
            idx = -(-p * n // 100)  # ceil(p*n/100), type-1 index
            s = int(d[idx - 1])
            fill = np.minimum(d, s).sum() / d.sum()
            r = rows[(brand, p)]
            assert r["stock_level"] == s, (brand, p)
            assert r["fill_rate"] == pytest.approx(fill, rel=1e-12)
            # monotone in p
        frs = [rows[(brand, p)]["fill_rate"] for p in FILL_PCTS]
        assert frs == sorted(frs)


def test_horvitz_thompson_accuracy_and_determinism(spark):
    from us_flight_bigdata_dashboard_spark.operators.sampling import (
        q_horvitz_thompson,
    )

    (r1,) = q_horvitz_thompson(spark, SF_DIR).collect()
    (r2,) = q_horvitz_thompson(spark, SF_DIR).collect()
    assert r1 == r2  # fully deterministic (hash coin, no RNG)
    assert r1["n_sampled"] > 50  # the budget actually materializes
    # PPS + HT should land within a loose accuracy band on this corpus
    assert abs(r1["rel_err_pct"]) < 25.0
    # and the estimate is exactly sum(y_i / pi_i) recomputed in Python
    docs = _df("documents")
    import hashlib

    sum_chars = int(docs["n_chars"].sum())
    total = 0.0
    n_s = 0
    true_total = 0
    for doc_id, n_chars, text in zip(docs["doc_id"], docs["n_chars"], docs["text"]):
        y = sum(1 for t in text.lower().split(" ") if t != "")
        true_total += y
        pi = min(1.0, 200 * int(n_chars) / sum_chars)
        h = int(hashlib.md5(str(doc_id).encode()).hexdigest()[:12], 16)
        if h < int(pi * (1 << 48)):
            n_s += 1
            total += y / pi
    assert r1["n_sampled"] == n_s
    assert r1["true_token_total"] == true_total
    assert r1["ht_token_total"] == pytest.approx(total, rel=1e-9)


# ---------------------------------------------------------------------------
# streaming_bounded_dedup_replay — drop/re-emit semantics
# ---------------------------------------------------------------------------


def test_bounded_dedup_semantics(spark):
    from us_flight_bigdata_dashboard_spark.streaming.replay import (
        _BDD_DUP_MOD,
        _BDD_REDELIVER_MOD,
        q_streaming_bounded_dedup_replay,
    )

    rows = q_streaming_bounded_dedup_replay(spark, SF_DIR).collect()
    ev = _df("events").dropna(subset=["ts"])
    counts = collections.Counter(r["event_id"] for r in rows)
    tmin = ev["ts"].min()
    first_day = set(
        ev.loc[
            (ev["ts"] < tmin + np.timedelta64(24, "h"))
            & (ev["event_id"] % _BDD_REDELIVER_MOD == 0),
            "event_id",
        ]
    )
    assert len(first_day) > 0
    for eid, n in counts.items():
        if eid in first_day:
            # redelivered after eviction: emitted exactly TWICE
            assert n == 2, (eid, n)
        else:
            # incl. the in-batch duplicated slice (ids % DUP_MOD == 0):
            # emitted exactly once
            assert n == 1, (eid, n)
    # the duplicated slice really existed and really deduped
    dup_ids = set(ev.loc[ev["event_id"] % _BDD_DUP_MOD == 0, "event_id"])
    assert len(dup_ids) > 0
    assert all(counts[e] in (1, 2) for e in dup_ids)


# ---------------------------------------------------------------------------
# events_interval_coverage / hoeffding_sample_bound — brute forces
# ---------------------------------------------------------------------------


def test_interval_coverage_sweep_bruteforce(spark):
    from us_flight_bigdata_dashboard_spark.operators.events import (
        COVER_TTL_MIN,
        q_events_interval_coverage,
    )

    ev = _df("events").dropna(subset=["ts"]).sort_values(["user_id", "ts", "event_id"])
    ttl = np.timedelta64(COVER_TTL_MIN * 60 * 1_000_000, "us")
    rows = {r["user_id"]: r for r in q_events_interval_coverage(spark, SF_DIR).collect()}
    for uid, grp in ev.groupby("user_id"):
        covered = np.timedelta64(0, "us")
        n_islands = 0
        cur_s = cur_e = None
        for ts in grp["ts"]:
            s, e = np.datetime64(ts), np.datetime64(ts) + ttl
            if cur_e is None or s > cur_e:
                if cur_e is not None:
                    covered += cur_e - cur_s
                cur_s, cur_e = s, e
                n_islands += 1
            else:
                cur_e = max(cur_e, e)
        if cur_e is not None:
            covered += cur_e - cur_s
        r = rows[uid]
        assert r["n_events"] == len(grp)
        assert r["n_islands"] == n_islands
        assert r["covered_hours"] == pytest.approx(
            covered / np.timedelta64(1, "h"), rel=1e-12
        )


def test_hoeffding_bound_identities(spark):
    from us_flight_bigdata_dashboard_spark.operators.statistics import (
        HOEFF_EPS,
        HOEFF_LN_2_OVER_DELTA,
        q_hoeffding_sample_bound,
    )

    ev = _df("events").dropna(subset=["value"])
    rows = {r["event_type"]: r for r in q_hoeffding_sample_bound(spark, SF_DIR).collect()}
    for etype, grp in ev.groupby("event_type"):
        v = grp["value"].values.astype(np.float64)
        r_range = v.max() - v.min()
        n_req = math.ceil(
            HOEFF_LN_2_OVER_DELTA * r_range * r_range / (2 * HOEFF_EPS**2)
        )
        r = rows[etype]
        assert r["n_current"] == len(v)
        assert r["value_range"] == pytest.approx(r_range, rel=1e-12)
        assert r["n_required"] == n_req
        assert r["sufficient"] == int(len(v) >= n_req)


# ---------------------------------------------------------------------------
# recursive_cte_walks / events_halflife_score — brute forces
# ---------------------------------------------------------------------------


def test_recursive_walks_bruteforce(spark):
    from us_flight_bigdata_dashboard_spark.operators.graph import (
        KHOP_SOURCE,
        WALKS_MAX_LEN,
        q_recursive_cte_walks,
    )

    li = _df("lineitem")[["l_orderkey", "l_suppkey"]]
    od = _df("orders")[["o_orderkey", "o_custkey"]]
    j = li.merge(od, left_on="l_orderkey", right_on="o_orderkey")
    pairs = {(f"c:{c}", f"s:{s}") for c, s in zip(j["o_custkey"], j["l_suppkey"])}
    adj: dict = {}
    for c, s in pairs:
        adj.setdefault(c, []).append(s)
        adj.setdefault(s, []).append(c)
    frontier = collections.Counter({KHOP_SOURCE: 1})
    expected = {0: (1, 1)}
    for ln in range(1, WALKS_MAX_LEN + 1):
        nxt = collections.Counter()
        for node, cnt in frontier.items():
            for nb in adj.get(node, []):
                nxt[nb] += cnt
        expected[ln] = (sum(nxt.values()), len(nxt))
        frontier = nxt
    rows = {r["walk_len"]: r for r in q_recursive_cte_walks(spark, SF_DIR).collect()}
    for ln, (n_walks, n_dist) in expected.items():
        assert rows[ln]["n_walks"] == n_walks, ln
        assert rows[ln]["n_distinct_endpoints"] == n_dist, ln


def test_halflife_score_bruteforce(spark):
    from us_flight_bigdata_dashboard_spark.operators.events import (
        HALFLIFE_DAYS,
        q_events_halflife_score,
    )

    ev = _df("events").dropna(subset=["ts", "value"])
    gm = ev["ts"].max()
    bucket = np.timedelta64(HALFLIFE_DAYS * 86_400_000_000, "us")
    rows = {r["user_id"]: r for r in q_events_halflife_score(spark, SF_DIR).collect()}
    for uid, grp in ev.groupby("user_id"):
        w = ((gm - grp["ts"]).values // bucket).astype(np.int64)
        score = float((grp["value"].values / np.exp2(w)).sum())
        r = rows[uid]
        assert r["n_events"] == len(grp)
        assert r["recency_score"] == pytest.approx(score, rel=1e-7)


# ---------------------------------------------------------------------------
# sequence_gap_audit — brute force (dense and gappy paths)
# ---------------------------------------------------------------------------


def test_sequence_gap_audit_bruteforce(spark):
    from us_flight_bigdata_dashboard_spark.operators.audit import (
        q_sequence_gap_audit,
    )

    keys = np.sort(_df("orders")["o_orderkey"].unique())
    (row,) = q_sequence_gap_audit(spark, SF_DIR).collect()
    assert row["n_keys"] == len(keys)
    assert row["key_min"] == keys[0] and row["key_max"] == keys[-1]
    span = int(keys[-1] - keys[0] + 1)
    assert row["total_missing"] == span - len(keys)
    diffs = np.diff(keys)
    gaps = diffs[diffs > 1]
    assert row["n_gaps"] == len(gaps)
    if len(gaps):
        assert row["largest_gap"] == int(gaps.max())
    else:
        assert row["largest_gap"] is None
        assert row["largest_gap_start"] is None
    assert row["density"] == pytest.approx(len(keys) / span, rel=1e-12)
