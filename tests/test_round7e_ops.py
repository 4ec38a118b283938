"""Planted-ground-truth tests for the late round-7 additions: SCD2
point-in-time resolution, Holt–Winters on a constant series, holiday lift,
backlog sweep, relational division, Flesch formula, centroid separation,
Lorenz deciles, and the integer Markov power iteration."""

from __future__ import annotations

import os

import pytest

from us_flight_bigdata_dashboard_spark.operators.advanced import (
    q_relational_division,
)
from us_flight_bigdata_dashboard_spark.operators.decision import (
    q_orders_backlog_timeline,
)
from us_flight_bigdata_dashboard_spark.operators.events import (
    MARKOV_FP,
    q_events_holiday_lift,
    q_events_holt_winters,
    q_events_markov_stationary,
)
from us_flight_bigdata_dashboard_spark.operators.mutation import (
    q_scd2_point_in_time,
)
from us_flight_bigdata_dashboard_spark.operators.similarity import (
    q_embedding_centroid_separation,
)
from us_flight_bigdata_dashboard_spark.operators.statistics import (
    q_lorenz_curve,
)
from us_flight_bigdata_dashboard_spark.operators.text import (
    FLESCH_A,
    FLESCH_B,
    FLESCH_C,
    q_text_readability,
)


def _write(spark, root, name, rows, schema, ts_cols=()):
    df = spark.createDataFrame(rows, schema)
    for c in ts_cols:
        df = df.withColumn(c, df[c].cast("timestamp"))
    df.write.mode("overwrite").parquet(os.path.join(root, f"{name}.parquet"))


ORDERS_SCHEMA = (
    "o_orderkey bigint, o_custkey bigint, o_orderstatus string, "
    "o_totalprice double, o_orderdate string, o_orderpriority string"
)
LINEITEM_SCHEMA = (
    "l_orderkey bigint, l_partkey bigint, l_suppkey bigint, l_linenumber bigint, "
    "l_quantity double, l_extendedprice double, l_discount double, l_tax double, "
    "l_returnflag string, l_linestatus string, l_shipdate string"
)
EV_SCHEMA = (
    "event_id bigint, ts string, user_id bigint, event_type string, "
    "value double, props string"
)


def test_scd2_pit_resolves_correct_version(spark, tmp_path_factory):
    """Order 7 (≡0 mod 7) re-prices at +30d; a line shipping day 10
    resolves v1, a line shipping day 40 resolves v2. Order 1 has only v1."""
    root = str(tmp_path_factory.mktemp("r7e_pit"))
    _write(
        spark,
        root,
        "orders",
        [
            (7, 1, "O", 100.0, "1995-01-01", "1-URGENT"),
            (1, 1, "O", 50.0, "1995-01-01", "1-URGENT"),
        ],
        ORDERS_SCHEMA,
        ts_cols=("o_orderdate",),
    )
    _write(
        spark,
        root,
        "lineitem",
        [
            (7, 1, 1, 1, 1.0, 0.0, 0.0, 0.0, "A", "O", "1995-01-11"),
            (7, 1, 1, 2, 1.0, 0.0, 0.0, 0.0, "A", "O", "1995-02-10"),
            (1, 1, 1, 1, 1.0, 0.0, 0.0, 0.0, "A", "O", "1995-01-05"),
        ],
        LINEITEM_SCHEMA,
        ts_cols=("l_shipdate",),
    )
    out = {r["version"]: r for r in q_scd2_point_in_time(spark, root).collect()}
    assert out[1]["n_lineitems"] == 2  # order 7 day-10 line + order 1 line
    assert out[2]["n_lineitems"] == 1  # order 7 day-40 line
    # v1 picks original prices (100 + 50), v2 the bumped price
    assert out[1]["sum_price_cents"] == 10000 + 5000
    assert out[2]["sum_price_cents"] > 10000


def test_holt_winters_constant_series_is_fixed_point(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("r7e_hw"))
    rows = [
        (i * 3 + j, f"2024-01-0{i + 1} {h:02d}:10:00", 1, "e", 0.0, "{}")
        for i in range(3)
        for j, h in enumerate(range(0, 24, 8))
    ]
    # exactly 3 events/day at hours 0,8,16 → hourly series is periodic, but
    # use a CONSTANT series instead: one event EVERY hour of 3 days
    rows = [
        (i, f"2024-01-0{d + 1} {h:02d}:10:00", 1, "e", 0.0, "{}")
        for i, (d, h) in enumerate(((d, h) for d in range(3) for h in range(24)))
    ]
    _write(spark, root, "events", rows, EV_SCHEMA, ts_cols=("ts",))
    out = q_events_holt_winters(spark, root).collect()
    assert len(out) == 24
    for r in out:
        # constant series x≡1: level 1, trend 0, seasonals 0 — exact fixpoint
        assert r["level"] == pytest.approx(1.0, abs=0)
        assert r["trend"] == pytest.approx(0.0, abs=0)
        assert r["forecast"] == pytest.approx(1.0, abs=0)


def test_holiday_lift_planted_double_rate(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("r7e_holiday"))
    rows, eid = [], 0
    # holidays 2024-01-01 / 2024-01-15: 4 events each; other Mondays
    # (Jan 8, 22, 29): 2 events each → lift = (8·3)/(2·6) = 2.0
    for d, n in [("01", 4), ("15", 4), ("08", 2), ("22", 2), ("29", 2)]:
        for k in range(n):
            eid += 1
            rows.append((eid, f"2024-01-{d} {k:02d}:00:00", 1, "e", 0.0, "{}"))
    _write(spark, root, "events", rows, EV_SCHEMA, ts_cols=("ts",))
    out = q_events_holiday_lift(spark, root).collect()[0]
    assert out["holiday_events"] == 8 and out["holiday_days"] == 2
    assert out["baseline_events"] == 6 and out["baseline_days"] == 3
    assert out["holiday_lift"] == pytest.approx(2.0, abs=0)


def test_backlog_month_end_counts(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("r7e_backlog"))
    # order 1 opens Jan 10, last ship Feb 10 (closes Feb 11)
    # order 2 opens Jan 20, last ship Jan 25 (closes Jan 26)
    _write(
        spark,
        root,
        "orders",
        [
            (1, 1, "O", 10.0, "1995-01-10", "1-URGENT"),
            (2, 1, "O", 10.0, "1995-01-20", "1-URGENT"),
        ],
        ORDERS_SCHEMA,
        ts_cols=("o_orderdate",),
    )
    _write(
        spark,
        root,
        "lineitem",
        [
            (1, 1, 1, 1, 1.0, 0.0, 0.0, 0.0, "A", "O", "1995-02-10"),
            (2, 1, 1, 1, 1.0, 0.0, 0.0, 0.0, "A", "O", "1995-01-25"),
        ],
        LINEITEM_SCHEMA,
        ts_cols=("l_shipdate",),
    )
    out = {r["ym"]: r["open_orders"] for r in q_orders_backlog_timeline(spark, root).collect()}
    assert out[199501] == 1  # order 2 closed Jan 26; order 1 still open
    assert out[199502] == 0  # everything shipped


def test_relational_division_quarters(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("r7e_div"))
    _write(
        spark,
        root,
        "customer",
        [(1, "C1", 0, 0.0, "B"), (2, "C2", 0, 0.0, "B")],
        "c_custkey bigint, c_name string, c_nationkey int, c_acctbal double, c_mktsegment string",
    )
    orders = [
        (10 * q, 1, "O", 100.0, f"1995-{3 * q - 1:02d}-01", "1-URGENT")
        for q in (1, 2, 3, 4)  # customer 1: one order per quarter
    ] + [(99, 2, "O", 100.0, "1995-06-01", "1-URGENT")]  # customer 2: Q2 only
    _write(spark, root, "orders", orders, ORDERS_SCHEMA, ts_cols=("o_orderdate",))
    out = q_relational_division(spark, root).collect()
    assert [r["c_custkey"] for r in out] == [1]
    assert out[0]["n_orders"] == 4


def test_flesch_formula_matches_hand_count(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("r7e_flesch"))
    text = "the cat sat. the dog ran!"  # 6 words, 2 sentences, 6 vowel runs
    _write(
        spark,
        root,
        "documents",
        [(1, text, "en", "s", len(text))],
        "doc_id bigint, text string, lang string, source string, n_chars bigint",
    )
    out = q_text_readability(spark, root).collect()[0]
    expected = FLESCH_A - FLESCH_B * (6 / 2) - FLESCH_C * (6 / 6)
    assert out["n_docs"] == 1
    assert out["mean_score"] == pytest.approx(expected, abs=1e-6)


def test_centroid_separation_constant_vectors(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("r7e_sep"))
    # label 0 vectors all [0]*64, label 1 all [0.5]*64 → distance 0.5·8 = 4.0
    rows = [(i, [0.0] * 64, 0) for i in range(5)]
    rows += [(100 + i, [0.5] * 64, 1) for i in range(7)]
    _write(
        spark,
        root,
        "embeddings",
        rows,
        "vec_id bigint, embedding array<float>, label int",
    )
    out = q_embedding_centroid_separation(spark, root).collect()
    assert len(out) == 1
    assert out[0]["n_a"] == 5 and out[0]["n_b"] == 7
    assert out[0]["centroid_dist"] == pytest.approx(4.0, abs=1e-9)


def test_lorenz_single_earner(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("r7e_lorenz"))
    _write(
        spark,
        root,
        "customer",
        [(c, f"C{c}", 0, 0.0, "B") for c in range(1, 11)],
        "c_custkey bigint, c_name string, c_nationkey int, c_acctbal double, c_mktsegment string",
    )
    _write(
        spark,
        root,
        "orders",
        [(1, 10, "O", 1000.0, "1995-06-01", "1-URGENT")],
        ORDERS_SCHEMA,
        ts_cols=("o_orderdate",),
    )
    out = {r["decile"]: r for r in q_lorenz_curve(spark, root).collect()}
    assert len(out) == 10
    for d in range(1, 10):
        assert out[d]["cum_share"] == pytest.approx(0.0, abs=0)
    assert out[10]["cum_share"] == pytest.approx(1.0, abs=0)


def test_markov_two_state_cycle(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("r7e_markov"))
    # one user alternating a→b→a→b… : deterministic 2-cycle; the uniform
    # integer start FP/2, FP/2 is exactly stationary under the swap
    rows = [
        (i, f"2024-01-01 {i:02d}:00:00", 1, "a" if i % 2 == 0 else "b", 0.0, "{}")
        for i in range(10)
    ]
    _write(spark, root, "events", rows, EV_SCHEMA, ts_cols=("ts",))
    out = {r["state"]: r for r in q_events_markov_stationary(spark, root).collect()}
    assert out["a"]["pi_fp"] == MARKOV_FP // 2
    assert out["b"]["pi_fp"] == MARKOV_FP // 2
