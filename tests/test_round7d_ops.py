"""Semantic ground-truth tests for the round-7 continuation batch: every
operator is checked against a PLANTED closed-form answer (monotone data →
ρ=τ=1, equal shares → Gini 0, equally spaced arrivals → burstiness −1,
shifted copies → cross-correlation 1 at the shift, hand-built triangle →
2-core, …). The driver gate proves Spark↔DuckDB agreement; these prove the
MATH is the textbook quantity, not merely the same number twice."""

from __future__ import annotations

import math
import os

import pytest

from us_flight_bigdata_dashboard_spark.operators.audit import (
    _BENFORD_P,
    q_benford_digits,
)
from us_flight_bigdata_dashboard_spark.operators.decision import (
    q_revenue_yoy_growth,
    q_sla_wilson_ci,
)
from us_flight_bigdata_dashboard_spark.operators.events import (
    q_events_burstiness,
    q_events_cross_correlation,
    q_events_interpolate_linear,
    q_events_peak_detection,
    q_events_time_to_convert,
    q_survival_kaplan_meier,
)
from us_flight_bigdata_dashboard_spark.operators.graph import q_graph_kcore
from us_flight_bigdata_dashboard_spark.operators.sampling import (
    SYST_K,
    SYST_OFFSET,
    q_sample_systematic,
)
from us_flight_bigdata_dashboard_spark.operators.statistics import (
    q_gini_revenue,
    q_kendall_tau,
    q_overdispersion_nb,
    q_spearman_corr,
    q_theil_sen_trend,
)
from us_flight_bigdata_dashboard_spark.operators.text import (
    q_text_simpson_diversity,
)


def _write(spark, root, name, rows, schema, ts_cols=()):
    df = spark.createDataFrame(rows, schema)
    for c in ts_cols:
        df = df.withColumn(c, df[c].cast("timestamp"))
    df.write.mode("overwrite").parquet(os.path.join(root, f"{name}.parquet"))


NATION = [(0, "ALPHA", 0)]
NATION_SCHEMA = "n_nationkey int, n_name string, n_regionkey int"


# ---------------------------------------------------------------------------
# rank correlations
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def rank_dir(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("r7d_rank"))
    # flag A: price strictly increasing with quantity → ρ = 1
    # flag B: price strictly decreasing with quantity → ρ = −1
    li = []
    for i in range(1, 21):
        li.append((i, 1, 1, 1, float(i), 100.0 + i, 0.0, 0.0, "A", "O", "1995-01-01"))
        li.append((100 + i, 1, 1, 1, float(i), 200.0 - i, 0.0, 0.0, "B", "O", "1995-01-01"))
    _write(
        spark,
        root,
        "lineitem",
        li,
        "l_orderkey bigint, l_partkey bigint, l_suppkey bigint, l_linenumber bigint, "
        "l_quantity double, l_extendedprice double, l_discount double, l_tax double, "
        "l_returnflag string, l_linestatus string, l_shipdate string",
    )
    return root


def test_spearman_planted_monotone(spark, rank_dir):
    rows = {r["l_returnflag"]: r for r in q_spearman_corr(spark, rank_dir).collect()}
    assert rows["A"]["rho_spearman"] == pytest.approx(1.0, abs=1e-12)
    assert rows["B"]["rho_spearman"] == pytest.approx(-1.0, abs=1e-12)


@pytest.fixture(scope="module")
def kendall_dir(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("r7d_kendall"))
    # 4 suppliers, acctbal ordered like their supplied revenue → τ = 1
    _write(
        spark,
        root,
        "supplier",
        [(s, f"S{s}", 0, 100.0 * s) for s in range(1, 5)],
        "s_suppkey bigint, s_name string, s_nationkey int, s_acctbal double",
    )
    li = []
    k = 0
    for s in range(1, 5):
        for _ in range(s):  # supplier s sells s items of 10.0 → revenue 10·s
            k += 1
            li.append((k, 1, s, 1, 1.0, 10.0, 0.0, 0.0, "A", "O", "1995-01-01"))
    _write(
        spark,
        root,
        "lineitem",
        li,
        "l_orderkey bigint, l_partkey bigint, l_suppkey bigint, l_linenumber bigint, "
        "l_quantity double, l_extendedprice double, l_discount double, l_tax double, "
        "l_returnflag string, l_linestatus string, l_shipdate string",
    )
    _write(spark, root, "nation", NATION, NATION_SCHEMA)
    return root


def test_kendall_planted_concordant(spark, kendall_dir):
    row = q_kendall_tau(spark, kendall_dir).collect()[0]
    assert row["n0"] == 6 and row["c"] == 6 and row["d"] == 0
    assert row["tau_b"] == pytest.approx(1.0, abs=1e-12)


# ---------------------------------------------------------------------------
# Gini + YoY (shared customer/orders/nation fixture)
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def rev_dir(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("r7d_rev"))
    _write(
        spark,
        root,
        "customer",
        [(c, f"C{c}", 0, 0.0, "BUILDING") for c in range(1, 6)],
        "c_custkey bigint, c_name string, c_nationkey int, c_acctbal double, c_mktsegment string",
    )
    # 1995: only customer 5 buys (total 1000) → Gini = (n−1)/n = 0.8
    # 1996: the same revenue 2× → YoY growth = 1.0 for the nation
    orders = [(1, 5, "O", 1000.0, "1995-06-01", "1-URGENT")]
    orders += [(2, 5, "O", 2000.0, "1996-06-01", "1-URGENT")]
    _write(
        spark,
        root,
        "orders",
        orders,
        "o_orderkey bigint, o_custkey bigint, o_orderstatus string, o_totalprice double, "
        "o_orderdate string, o_orderpriority string",
        ts_cols=("o_orderdate",),
    )
    _write(spark, root, "nation", NATION, NATION_SCHEMA)
    return root


def test_gini_single_earner(spark, rev_dir):
    row = q_gini_revenue(spark, rev_dir).collect()[0]
    assert row["n_customers"] == 5
    assert row["gini"] == pytest.approx(0.8, abs=1e-12)


def test_yoy_planted_doubling(spark, rev_dir):
    rows = q_revenue_yoy_growth(spark, rev_dir).collect()
    assert rows[0]["yoy_growth"] is None  # first year has no prior
    assert rows[1]["yoy_growth"] == pytest.approx(1.0, abs=1e-12)


# ---------------------------------------------------------------------------
# Theil–Sen (exact linear trend)
# ---------------------------------------------------------------------------


def test_theil_sen_exact_linear(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("r7d_ts"))
    _write(
        spark,
        root,
        "customer",
        [(1, "C1", 0, 0.0, "BUILDING")],
        "c_custkey bigint, c_name string, c_nationkey int, c_acctbal double, c_mktsegment string",
    )
    _write(spark, root, "nation", NATION, NATION_SCHEMA)
    _write(spark, root, "region", [(0, "R")], "r_regionkey int, r_name string")
    # one order per month, revenue 100 + 10·m dollars → slope 1000 cents/mo
    orders = [
        (m, 1, "O", 100.0 + 10.0 * m, f"1995-{m:02d}-15", "1-URGENT")
        for m in range(1, 13)
    ]
    _write(
        spark,
        root,
        "orders",
        orders,
        "o_orderkey bigint, o_custkey bigint, o_orderstatus string, o_totalprice double, "
        "o_orderdate string, o_orderpriority string",
        ts_cols=("o_orderdate",),
    )
    row = q_theil_sen_trend(spark, root).collect()[0]
    assert row["n_pairs"] == 66
    assert row["trend_cents_per_month"] == pytest.approx(1000.0, abs=1e-9)


# ---------------------------------------------------------------------------
# Benford expectations
# ---------------------------------------------------------------------------


def test_benford_constants_and_counts(spark, tmp_path_factory):
    for d in range(1, 10):
        assert _BENFORD_P[d] == pytest.approx(math.log10(1 + 1 / d), abs=0)
    root = str(tmp_path_factory.mktemp("r7d_benford"))
    # 9 orders with first digits 1..9, plus one more with first digit 1
    prices = [float(d) * 1000.0 for d in range(1, 10)] + [1500.0]
    _write(
        spark,
        root,
        "orders",
        [(i, 1, "O", p, "1995-01-01", "1-URGENT") for i, p in enumerate(prices)],
        "o_orderkey bigint, o_custkey bigint, o_orderstatus string, o_totalprice double, "
        "o_orderdate string, o_orderpriority string",
        ts_cols=("o_orderdate",),
    )
    rows = {r["digit"]: r for r in q_benford_digits(spark, root).collect()}
    assert rows[1]["obs"] == 2 and rows[2]["obs"] == 1
    assert rows[1]["n"] == 10
    assert rows[1]["observed_p"] == pytest.approx(0.2, abs=0)


# ---------------------------------------------------------------------------
# events family (shared planted event fixture per test)
# ---------------------------------------------------------------------------

EV_SCHEMA = (
    "event_id bigint, ts string, user_id bigint, event_type string, "
    "value double, props string"
)


def _ev(spark, tmp_path_factory, name, rows):
    root = str(tmp_path_factory.mktemp(name))
    _write(spark, root, "events", rows, EV_SCHEMA, ts_cols=("ts",))
    return root


def test_burstiness_regular_clock(spark, tmp_path_factory):
    rows = [
        (i, f"2024-01-01 {i:02d}:00:00", 1, "tick", 0.0, "{}") for i in range(10)
    ]
    root = _ev(spark, tmp_path_factory, "r7d_burst", rows)
    out = q_events_burstiness(spark, root).collect()[0]
    assert out["n_gaps"] == 9
    assert out["mean_gap_s"] == pytest.approx(3600.0, abs=0)
    assert out["burstiness"] == pytest.approx(-1.0, abs=0)  # σ = 0 exactly


def test_cross_correlation_planted_shift(spark, tmp_path_factory):
    # purchase counts = view counts shifted forward by exactly 1 hour
    rows, eid = [], 0
    pattern = [1, 3, 2, 5, 4, 1, 2, 6, 3, 1]
    for h, c in enumerate(pattern):
        for _ in range(c):
            eid += 1
            rows.append((eid, f"2024-01-01 {h:02d}:30:00", 1, "view", 0.0, "{}"))
        for _ in range(c):
            eid += 1
            rows.append((eid, f"2024-01-01 {h + 1:02d}:30:00", 1, "purchase", 0.0, "{}"))
    root = _ev(spark, tmp_path_factory, "r7d_xcorr", rows)
    out = {r["lag_hours"]: r for r in q_events_cross_correlation(spark, root).collect()}
    assert out[1]["xcorr_r"] == pytest.approx(1.0, abs=1e-12)
    assert out[0]["xcorr_r"] < 1.0


def test_kaplan_meier_no_censoring(spark, tmp_path_factory):
    # horizon user pins max_s far right so the 3 subjects all churn;
    # lifetimes 1h, 2h, 2h → S = 2/3 after t=1, 0 after t=2
    rows = [
        (1, "2024-01-01 00:00:00", 1, "a", 0.0, "{}"),
        (2, "2024-01-01 01:00:00", 1, "a", 0.0, "{}"),
        (3, "2024-01-01 00:00:00", 2, "a", 0.0, "{}"),
        (4, "2024-01-01 02:00:00", 2, "a", 0.0, "{}"),
        (5, "2024-01-01 00:00:00", 3, "a", 0.0, "{}"),
        (6, "2024-01-01 02:00:00", 3, "a", 0.0, "{}"),
        (7, "2024-01-10 00:00:00", 99, "a", 0.0, "{}"),  # horizon pin
    ]
    root = _ev(spark, tmp_path_factory, "r7d_km", rows)
    out = {r["t_hours"]: r for r in q_survival_kaplan_meier(spark, root).collect()}
    # subjects at risk at t=1: the three 1-2h users + the 0h-lifetime
    # horizon user's own row (t=0, censored-excluded since d=0 rows drop)
    assert out[1]["n_events"] == 1
    assert out[1]["survival"] == pytest.approx(
        (out[1]["n_risk"] - 1) / out[1]["n_risk"], abs=0
    )
    assert out[2]["survival"] == pytest.approx(0.0, abs=0)


def test_peak_detection_single_spike(spark, tmp_path_factory):
    # 1 event/hour background with a 30-event spike at hour 12
    rows, eid = [], 0
    for h in range(24):
        n = 30 if h == 12 else 1
        for _ in range(n):
            eid += 1
            rows.append((eid, f"2024-01-01 {h:02d}:15:00", 1, "click", 0.0, "{}"))
    root = _ev(spark, tmp_path_factory, "r7d_peak", rows)
    out = q_events_peak_detection(spark, root).collect()
    assert len(out) == 1 and out[0]["n_events"] == 30
    assert out[0]["zscore"] > 2.0


def test_time_to_convert_exact_percentiles(spark, tmp_path_factory):
    # 10 converters with deltas 1..10 hours → p50 = 5h, p90 = 9h, p99 = 10h
    rows, eid = [], 0
    for u in range(1, 11):
        eid += 1
        rows.append((eid, "2024-01-01 00:00:00", u, "view", 0.0, "{}"))
        eid += 1
        rows.append((eid, f"2024-01-01 {u:02d}:00:00", u, "purchase", 0.0, "{}"))
    root = _ev(spark, tmp_path_factory, "r7d_ttc", rows)
    out = q_events_time_to_convert(spark, root).collect()[0]
    assert out["n_converters"] == 10
    assert out["p50_s"] == 5 * 3600
    assert out["p90_s"] == 9 * 3600
    assert out["p99_s"] == 10 * 3600


def test_interpolation_midpoint(spark, tmp_path_factory):
    # observations at 00:00 (0.0) and 02:00 (10.0) → hour 1 interpolates 5.0
    rows = [
        (1, "2024-01-01 00:00:00", 1, "m", 0.0, "{}"),
        (2, "2024-01-01 02:00:00", 1, "m", 10.0, "{}"),
    ]
    root = _ev(spark, tmp_path_factory, "r7d_interp", rows)
    out = {r["hour_idx"]: r for r in q_events_interpolate_linear(spark, root).collect()}
    mid = sorted(out)[1]
    assert out[mid]["value_interp"] == pytest.approx(5.0, abs=0)
    # observation AT the mark returns the observation exactly
    assert out[sorted(out)[0]]["value_interp"] == pytest.approx(0.0, abs=0)


def test_overdispersion_equal_counts(spark, tmp_path_factory):
    # every user has exactly 3 events → var 0, vmr 0, NB fit refused
    rows, eid = [], 0
    for u in range(1, 6):
        for k in range(3):
            eid += 1
            rows.append((eid, f"2024-01-0{u} 0{k}:00:00", u, "e", 0.0, "{}"))
    root = _ev(spark, tmp_path_factory, "r7d_od", rows)
    out = q_overdispersion_nb(spark, root).collect()[0]
    assert out["n_users"] == 5
    assert out["vmr"] == pytest.approx(0.0, abs=0)
    assert out["nb_r"] is None and out["nb_p"] is None


# ---------------------------------------------------------------------------
# k-core on a hand-built graph
# ---------------------------------------------------------------------------


def test_kcore_triangle_with_pendant(spark, tmp_path_factory):
    """Parts 1-2-3 form a triangle (each pair co-purchased in 2 orders);
    part 4 hangs off part 1 (also support 2). The 2-core is exactly the
    triangle: node 4 peels (degree 1), and its removal must NOT affect
    the triangle — but a one-shot degree filter would keep 4's edge
    endpoints inconsistent; the iteration is what removes it cleanly."""
    root = str(tmp_path_factory.mktemp("r7d_kcore"))
    li, k = [], 0
    orders = [
        (1, 2), (1, 2),  # edge 1-2 twice
        (2, 3), (2, 3),
        (1, 3), (1, 3),
        (1, 4), (1, 4),  # pendant
    ]
    for o, (a, b) in enumerate(orders, start=1):
        for p in (a, b):
            k += 1
            li.append((o, p, 1, k, 1.0, 10.0, 0.0, 0.0, "A", "O", "1995-01-01"))
    _write(
        spark,
        root,
        "lineitem",
        li,
        "l_orderkey bigint, l_partkey bigint, l_suppkey bigint, l_linenumber bigint, "
        "l_quantity double, l_extendedprice double, l_discount double, l_tax double, "
        "l_returnflag string, l_linestatus string, l_shipdate string",
    )
    out = q_graph_kcore(spark, root).collect()[0]
    assert out["n_core_nodes"] == 3
    assert out["n_core_edges"] == 3
    assert out["min_degree"] == 2 and out["max_degree"] == 2


# ---------------------------------------------------------------------------
# Wilson interval sanity
# ---------------------------------------------------------------------------


def test_wilson_brackets_phat(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("r7d_wilson"))
    _write(
        spark,
        root,
        "supplier",
        [(1, "S1", 0, 0.0)],
        "s_suppkey bigint, s_name string, s_nationkey int, s_acctbal double",
    )
    _write(spark, root, "nation", NATION, NATION_SCHEMA)
    # 10 on-time (ship +10d), 10 late (ship +200d)
    orders = [
        (o, 1, "O", 100.0, "1995-01-01", "1-URGENT") for o in range(1, 21)
    ]
    _write(
        spark,
        root,
        "orders",
        orders,
        "o_orderkey bigint, o_custkey bigint, o_orderstatus string, o_totalprice double, "
        "o_orderdate string, o_orderpriority string",
        ts_cols=("o_orderdate",),
    )
    li = [
        (o, 1, 1, 1, 1.0, 10.0, 0.0, 0.0, "A", "O",
         "1995-01-11" if o <= 10 else "1995-07-20")
        for o in range(1, 21)
    ]
    _write(
        spark,
        root,
        "lineitem",
        li,
        "l_orderkey bigint, l_partkey bigint, l_suppkey bigint, l_linenumber bigint, "
        "l_quantity double, l_extendedprice double, l_discount double, l_tax double, "
        "l_returnflag string, l_linestatus string, l_shipdate string",
        ts_cols=("l_shipdate",),
    )
    out = q_sla_wilson_ci(spark, root).collect()[0]
    assert out["n_items"] == 20 and out["n_ontime"] == 10
    assert out["p_ontime"] == pytest.approx(0.5, abs=0)
    assert 0.0 < out["wilson_lo"] < 0.5 < out["wilson_hi"] < 1.0
    # Wilson at p̂=0.5 is symmetric around 0.5
    assert (0.5 - out["wilson_lo"]) == pytest.approx(out["wilson_hi"] - 0.5, abs=1e-12)


# ---------------------------------------------------------------------------
# Simpson diversity + systematic sampling on documents
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def docs_dir(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("r7d_docs"))
    docs = [(i, "same same same same", "xx", "s", 19) for i in range(1, 101)]
    docs += [(100 + i, "alpha beta gamma delta", "yy", "s", 22) for i in range(1, 101)]
    _write(
        spark,
        root,
        "documents",
        docs,
        "doc_id bigint, text string, lang string, source string, n_chars bigint",
    )
    return root


def test_simpson_extremes(spark, docs_dir):
    rows = {r["lang"]: r for r in q_text_simpson_diversity(spark, docs_dir).collect()}
    assert rows["xx"]["simpson_repeat"] == pytest.approx(1.0, abs=1e-12)
    # 4 distinct tokens each ×100 over N=400: D = 4·(100·99)/(400·399)
    assert rows["yy"]["simpson_repeat"] == pytest.approx(
        4 * (100 * 99) / (400 * 399), abs=1e-15
    )


def test_systematic_rank_congruence(spark, docs_dir):
    out = [r["doc_id"] for r in q_sample_systematic(spark, docs_dir).collect()]
    # doc_ids are 1..200 consecutive → rank == doc_id
    assert out == [i for i in range(1, 201) if i % SYST_K == SYST_OFFSET]
