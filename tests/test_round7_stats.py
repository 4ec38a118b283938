"""Semantic ground-truth tests for the round-7 experimentation statistics:
Welch's t-test on a planted mean shift, Benjamini–Hochberg step-up
invariants, and the Poisson-bootstrap CI's determinism + coverage sanity.
The driver gate verifies cross-engine agreement; these verify the MATH."""

from __future__ import annotations

import os

import pytest

from us_flight_bigdata_dashboard_spark.operators.events import (
    q_events_cusum_changepoint,
    q_events_seasonal_hourly,
)
from us_flight_bigdata_dashboard_spark.operators.statistics import (
    BOOTSTRAP_B,
    q_ab_diff_in_differences,
    q_bh_fdr,
    q_bootstrap_ci,
    q_welch_ttest,
)


@pytest.fixture(scope="module")
def exp_dir(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("r7_stats"))
    # All events in the experiment period (after CUPED_SPLIT 2024-01-16).
    # Arm = user_id % 2. Even users get value 10 + (u mod 5), odd users
    # 15 + (u mod 5); the (u mod 5) residues match across arms, so the
    # true arm mean difference is EXACTLY 5.
    rows = []
    for u in range(20):
        base = 10.0 if u % 2 == 0 else 15.0
        rows.append(
            (u, "2024-02-0%d 12:00:00" % ((u % 9) + 1), u, "view", base + (u % 5), "{}")
        )
    spark.createDataFrame(
        rows, "event_id bigint, _t string, user_id bigint, event_type string, value double, props string"
    ).selectExpr(
        "event_id", "CAST(_t AS TIMESTAMP) AS ts", "user_id", "event_type", "value", "props"
    ).write.mode("overwrite").parquet(os.path.join(root, "events.parquet"))
    return root


def test_welch_recovers_planted_shift(spark, exp_dir):
    row = q_welch_ttest(spark, exp_dir).collect()[0]
    assert row["n0"] == 10 and row["n1"] == 10
    assert row["mean_diff"] == pytest.approx(5.0, abs=1e-12)
    assert row["t_stat"] > 0
    # Satterthwaite df lies in [min(n)-1, n0+n1-2]
    assert 9.0 <= row["df_welch"] <= 18.0 + 1e-9


def test_bh_stepup_invariants(spark, exp_dir):
    rows = q_bh_fdr(spark, exp_dir).collect()
    m = len(rows)
    assert m > 0
    assert [r["bh_rank"] for r in rows] == list(range(1, m + 1))
    # p is non-decreasing in rank and rejections are exactly a prefix
    ps = [r["p_surrogate"] for r in rows]
    assert ps == sorted(ps)
    flags = [r["rejected"] for r in rows]
    k = sum(flags)
    assert flags == [1] * k + [0] * (m - k)
    # every rejected rank satisfies the step-up property at the cutoff
    if k:
        assert ps[k - 1] <= k * 0.05 / m


def test_bootstrap_ci_deterministic_and_ordered(spark, exp_dir):
    a = q_bootstrap_ci(spark, exp_dir).collect()[0]
    b = q_bootstrap_ci(spark, exp_dir).collect()[0]
    assert a == b  # hash-derived weights: bit-identical across runs
    assert a["n_resamples"] == BOOTSTRAP_B
    assert a["ci_lo"] <= a["ci_hi"]
    # the interval is a real spread around the point estimate
    assert a["ci_lo"] < a["point_mean"] < a["ci_hi"]


@pytest.fixture(scope="module")
def did_dir(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("r7_did"))
    # 2×2 design: every user has one pre event (2024-01-10) and one post
    # (2024-02-10). Control (even users): pre 10, post 11 (+1 drift).
    # Treated (odd users): pre 20, post 26 (+6). DiD = 6 − 1 = 5 exactly.
    rows = []
    for u in range(10):
        pre, post = (10.0, 11.0) if u % 2 == 0 else (20.0, 26.0)
        rows.append((u * 2, "2024-01-10 10:00:00", u, "view", pre, "{}"))
        rows.append((u * 2 + 1, "2024-02-10 10:00:00", u, "view", post, "{}"))
    spark.createDataFrame(
        rows, "event_id bigint, _t string, user_id bigint, event_type string, value double, props string"
    ).selectExpr(
        "event_id", "CAST(_t AS TIMESTAMP) AS ts", "user_id", "event_type", "value", "props"
    ).write.mode("overwrite").parquet(os.path.join(root, "events.parquet"))
    return root


def test_did_recovers_planted_effect(spark, did_dir):
    rows = {r["arm"]: r for r in q_ab_diff_in_differences(spark, did_dir).collect()}
    assert rows[0]["delta"] == pytest.approx(1.0, abs=1e-9)
    assert rows[1]["delta"] == pytest.approx(6.0, abs=1e-9)
    assert rows[0]["did_effect"] == pytest.approx(5.0, abs=1e-9)
    assert rows[1]["did_effect"] == rows[0]["did_effect"]


@pytest.fixture(scope="module")
def qr_dir(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("r7_qr"))
    # 90 rows on y = 200x exactly; 10 extreme high outliers. The median
    # (tau=0.5) fit must pick slope 200 from the grid; the tau=0.9 fit is
    # pulled to a higher slope by the upper tail.
    rows = [(i, i, i, 1, float(1 + i % 5), 200.0 * (1 + i % 5), 0.0, 0.0, "N", "O",
             "1995-01-01 00:00:00") for i in range(90)]
    rows += [(100 + i, 100 + i, 100 + i, 1, 2.0, 8000.0, 0.0, 0.0, "N", "O",
              "1995-01-01 00:00:00") for i in range(10)]
    spark.createDataFrame(
        rows,
        "l_orderkey bigint, l_partkey bigint, l_suppkey bigint, l_linenumber int,"
        " l_quantity double, l_extendedprice double, l_discount double, l_tax double,"
        " l_returnflag string, l_linestatus string, _d string",
    ).selectExpr(
        "l_orderkey", "l_partkey", "l_suppkey", "l_linenumber", "l_quantity",
        "l_extendedprice", "l_discount", "l_tax", "l_returnflag", "l_linestatus",
        "CAST(_d AS TIMESTAMP) AS l_shipdate",
    ).write.mode("overwrite").parquet(os.path.join(root, "lineitem.parquet"))
    return root


def test_quantile_grid_median_resists_outliers(spark, qr_dir):
    from us_flight_bigdata_dashboard_spark.operators.statistics import (
        q_quantile_regression_grid,
    )

    rows = {r["tau"]: r for r in q_quantile_regression_grid(spark, qr_dir).collect()}
    assert rows["0.5"]["best_slope"] == 200  # 10% outliers can't move the median fit
    assert rows["0.9"]["best_slope"] >= rows["0.5"]["best_slope"]
    assert rows["0.5"]["n"] == 100


@pytest.fixture(scope="module")
def shift_dir(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("r7_cusum"))
    # One event type: 10 observations at 1.0 then 10 at 9.0 — the centered
    # prefix sum |Σ(x−μ)| peaks exactly at the boundary (index 10, where
    # the cumulative deficit bottoms out at 10·|1−5| = 40).
    rows = [
        (i, "2024-03-01 %02d:30:00" % i, 1, "metric", 1.0 if i < 10 else 9.0, "{}")
        for i in range(20)
    ]
    # Second type with a clean hourly pattern across two days: value =
    # hour for hours 0..5, both days — day means are equal (2.5), so the
    # seasonal offset at hour h is exactly h − 2.5.
    rows += [
        (100 + d * 10 + h, "2024-03-%02d %02d:00:00" % (10 + d, h), 2, "season", float(h), "{}")
        for d in range(2)
        for h in range(6)
    ]
    spark.createDataFrame(
        rows, "event_id bigint, _t string, user_id bigint, event_type string, value double, props string"
    ).selectExpr(
        "event_id", "CAST(_t AS TIMESTAMP) AS ts", "user_id", "event_type", "value", "props"
    ).write.mode("overwrite").parquet(os.path.join(root, "events.parquet"))
    return root


def test_holt_tracks_linear_ramp(spark, shift_dir):
    # On an exact linear ramp x_t = t the Holt(1/2, 1/2) state converges
    # toward trend 1 and level ≈ x_t; the 7-step forecast must extrapolate
    # BEYOND the last observation.
    import os as _os

    from us_flight_bigdata_dashboard_spark.operators.events import (
        q_events_holt_linear,
    )

    root = str(shift_dir) + "/../r7_holt"
    rows = [
        (i, "2024-03-01 %02d:%02d:00" % (i // 60, i % 60), 1, "ramp", float(i), "{}")
        for i in range(40)
    ]
    spark.createDataFrame(
        rows, "event_id bigint, _t string, user_id bigint, event_type string, value double, props string"
    ).selectExpr(
        "event_id", "CAST(_t AS TIMESTAMP) AS ts", "user_id", "event_type", "value", "props"
    ).write.mode("overwrite").parquet(_os.path.join(root, "events.parquet"))
    r = q_events_holt_linear(spark, root).collect()[0]
    assert r["n"] == 40
    assert r["trend"] == pytest.approx(1.0, abs=0.05)  # converged slope
    assert r["forecast_h"] > 39.0  # extrapolates past the last value


def test_lttb_keeps_extremes(spark, tmp_path_factory):
    # 40-point flat series with one huge spike: LTTB must keep first,
    # last, and the spike (a stride sample at B=12 could miss it).
    import os as _os

    from us_flight_bigdata_dashboard_spark.operators.events import (
        LTTB_B,
        q_events_lttb_downsample,
    )

    root = str(tmp_path_factory.mktemp("r7_lttb"))
    rows = [
        (i, "2024-03-01 %02d:%02d:00" % (i // 60, i % 60), 1, "flat",
         1000.0 if i == 17 else 1.0, "{}")
        for i in range(40)
    ]
    spark.createDataFrame(
        rows, "event_id bigint, _t string, user_id bigint, event_type string, value double, props string"
    ).selectExpr(
        "event_id", "CAST(_t AS TIMESTAMP) AS ts", "user_id", "event_type", "value", "props"
    ).write.mode("overwrite").parquet(_os.path.join(root, "events.parquet"))
    rows_out = q_events_lttb_downsample(spark, root).collect()
    assert len(rows_out) == LTTB_B
    vals = [r["value"] for r in rows_out]
    assert vals[0] == 1.0 and vals[-1] == 1.0  # endpoints kept
    assert 1000.0 in vals  # the spike survives downsampling


def test_funnel_exclusion_kill_semantics(spark, tmp_path_factory):
    # u1 converts cleanly; u2's error precedes the click (killed); u3
    # clicks cleanly but errors before purchasing (killed); u4 never views.
    import os as _os

    from us_flight_bigdata_dashboard_spark.operators.events import (
        q_events_funnel_exclusion,
    )

    root = str(tmp_path_factory.mktemp("r7_funnel_ex"))
    ev = [
        (1, "view", 1), (1, "click", 2), (1, "purchase", 3),
        (2, "view", 1), (2, "error", 2), (2, "click", 3), (2, "purchase", 4),
        (3, "view", 1), (3, "click", 2), (3, "error", 3), (3, "purchase", 4),
        (4, "click", 1), (4, "purchase", 2),
    ]
    rows = [
        (i, "2024-03-01 00:%02d:00" % m, u, t, 1.0, "{}")
        for i, (u, t, m) in enumerate(ev)
    ]
    spark.createDataFrame(
        rows, "event_id bigint, _t string, user_id bigint, event_type string, value double, props string"
    ).selectExpr(
        "event_id", "CAST(_t AS TIMESTAMP) AS ts", "user_id", "event_type", "value", "props"
    ).write.mode("overwrite").parquet(_os.path.join(root, "events.parquet"))
    r = q_events_funnel_exclusion(spark, root).collect()[0]
    assert r["n_users"] == 4
    assert r["n_viewed"] == 3
    assert r["n_clean_click"] == 2
    assert r["n_clean_purchase"] == 1
    assert r["n_killed_by_error"] == 2


def test_cusum_finds_planted_changepoint(spark, shift_dir):
    rows = {r["event_type"]: r for r in q_events_cusum_changepoint(spark, shift_dir).collect()}
    cp = rows["metric"]
    assert cp["n"] == 20
    assert cp["cp_index"] == 10
    assert cp["max_abs_cusum"] == pytest.approx(40.0, abs=1e-9)


def test_seasonal_offsets_detrended(spark, shift_dir):
    rows = [
        r
        for r in q_events_seasonal_hourly(spark, shift_dir).collect()
        if r["event_type"] == "season"
    ]
    assert len(rows) == 6
    for r in rows:
        assert r["seasonal_offset"] == pytest.approx(r["hour"] - 2.5, abs=1e-9)
        assert r["n_c"] == 2
