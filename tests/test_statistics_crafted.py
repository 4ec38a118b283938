"""Semantic ground-truth tests for the statistics and graph-triangle
operators on crafted data: planted linear relations, an exactly-independent
contingency table, an alternating time series, and a known triangle — the
driver tables verify cross-engine agreement; these verify the MATH."""

from __future__ import annotations

import os

import pytest

from us_flight_bigdata_dashboard_spark.operators.graph import q_graph_triangles
from us_flight_bigdata_dashboard_spark.operators.statistics import (
    q_autocorr_lag,
    q_chi_square_assoc,
    q_corr_pairs,
    q_regression_ols,
)


@pytest.fixture(scope="module")
def stats_dir(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("stats_crafted"))
    # lineitem: flag A lies exactly on y = 2x + 3, flag B on y = -x + 100;
    # discount decreases linearly in quantity (perfect negative corr)
    rows = []
    for q in range(1, 21):
        rows.append(("A", float(q), 2.0 * q + 3.0, 0.05 - 0.001 * q))
        rows.append(("B", float(q), -1.0 * q + 100.0, 0.05 - 0.001 * q))
    spark.createDataFrame(
        rows, "l_returnflag string, l_quantity double, l_extendedprice double, l_discount double"
    ).write.mode("overwrite").parquet(os.path.join(root, "lineitem.parquet"))

    # orders: contingency counts chosen so observed == expected exactly
    # (N=9: A×p1=4, A×p2=2, B×p1=2, B×p2=1 — margins 6/3 and 6/3)
    cells = [("A", "p1")] * 4 + [("A", "p2")] * 2 + [("B", "p1")] * 2 + [("B", "p2")]
    orders = [
        (i, "1997-01-0%d 00:00:00" % ((i % 9) + 1), s, p)
        for i, (s, p) in enumerate(cells)
    ]
    spark.createDataFrame(
        orders, "o_orderkey bigint, _d string, o_orderstatus string, o_orderpriority string"
    ).selectExpr(
        "o_orderkey", "CAST(_d AS TIMESTAMP) AS o_orderdate", "o_orderstatus", "o_orderpriority"
    ).write.mode("overwrite").parquet(os.path.join(root, "orders.parquet"))
    return root


@pytest.fixture(scope="module")
def ts_dir(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("ts_crafted"))
    # alternating daily order counts 1,3,1,3,... over 12 consecutive days
    rows = []
    key = 0
    for day in range(1, 13):
        n = 1 if day % 2 else 3
        for _ in range(n):
            rows.append((key, "1997-01-%02d 00:00:00" % day))
            key += 1
    spark.createDataFrame(rows, "o_orderkey bigint, _d string").selectExpr(
        "o_orderkey", "CAST(_d AS TIMESTAMP) AS o_orderdate"
    ).write.mode("overwrite").parquet(os.path.join(root, "orders.parquet"))
    return root


@pytest.fixture(scope="module")
def tri_dir(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("tri_crafted"))
    # parts {1,2,3} co-purchased in TWO orders (support 2 → all three
    # edges survive → one triangle); parts {3,4} co-purchased once only
    # (support 1 → edge filtered, part 4 in no triangle)
    li = (
        [(10, p) for p in (1, 2, 3)]
        + [(11, p) for p in (1, 2, 3)]
        + [(20, 3), (20, 4)]
    )
    spark.createDataFrame(li, "l_orderkey bigint, l_partkey bigint").write.mode(
        "overwrite"
    ).parquet(os.path.join(root, "lineitem.parquet"))
    return root


def test_ols_recovers_planted_lines(spark, stats_dir):
    got = {r["l_returnflag"]: r for r in q_regression_ols(spark, stats_dir).collect()}
    assert got["A"]["slope"] == pytest.approx(2.0, abs=1e-9)
    assert got["A"]["intercept"] == pytest.approx(3.0, abs=1e-9)
    assert got["A"]["r2"] == pytest.approx(1.0, abs=1e-9)
    assert got["B"]["slope"] == pytest.approx(-1.0, abs=1e-9)
    assert got["B"]["intercept"] == pytest.approx(100.0, abs=1e-9)
    assert got["B"]["r2"] == pytest.approx(1.0, abs=1e-9)


def test_corr_signs_and_bounds(spark, stats_dir):
    rows = {(r["col_a"], r["col_b"]): r["pearson_r"] for r in q_corr_pairs(spark, stats_dir).collect()}
    # quantity↔discount is a planted exact negative linear relation
    assert rows[("l_quantity", "l_discount")] == pytest.approx(-1.0, abs=1e-6)
    for r in rows.values():
        assert -1.0 - 1e-9 <= r <= 1.0 + 1e-9


def test_chi_square_zero_for_independent_table(spark, stats_dir):
    row = q_chi_square_assoc(spark, stats_dir).collect()[0]
    assert row["n_rows"] == 9 and row["n_cells"] == 4
    assert row["chi_square"] == pytest.approx(0.0, abs=1e-9)


def test_autocorr_alternating_series_negative_lag1(spark, ts_dir):
    got = {r["lag"]: r for r in q_autocorr_lag(spark, ts_dir).collect()}
    # perfect alternation: lag-1 strongly negative, lag-7 (odd) also negative
    assert got[1]["n_pairs"] == 11
    assert got[1]["autocorr"] < -0.85
    assert got[7]["autocorr"] < 0.0


def test_triangle_count_known_graph(spark, tri_dir):
    got = {(r["partkey"], r["n_triangles"]) for r in q_graph_triangles(spark, tri_dir).collect()}
    # exactly one triangle (1,2,3); part 4's single co-purchase is below
    # the support floor, so it joins no edge and no triangle
    assert got == {(1, 1), (2, 1), (3, 1)}


def test_clustering_coeff_known_graph(spark, tri_dir):
    from us_flight_bigdata_dashboard_spark.operators.graph import (
        q_graph_clustering_coeff,
    )

    rows = {r["partkey"]: r for r in q_graph_clustering_coeff(spark, tri_dir).collect()}
    # {1,2,3} form K3: every node has degree 2, one triangle, coeff exactly
    # 2*1/(2*1) = 1.0; part 4's sub-support edge is gone entirely
    assert set(rows) == {1, 2, 3}
    for r in rows.values():
        assert r["degree"] == 2
        assert r["n_triangles"] == 1
        assert r["clustering_coeff"] == 1.0
