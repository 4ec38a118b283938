"""Semantic ground-truth tests for the round-2 late operators on crafted
data: a planted attribution chain, a known path graph, a hand-solved
dominance set, a designed fuzzy-match block, and a BM25 corpus with a
computable score ordering. The driver matrix verifies cross-engine
agreement; these verify the SEMANTICS against hand-computed answers."""

from __future__ import annotations

import os

import pytest

from us_flight_bigdata_dashboard_spark.operators.advanced import q_heavy_hitters
from us_flight_bigdata_dashboard_spark.operators.breadth import q_skyline_pareto
from us_flight_bigdata_dashboard_spark.operators.dedup import q_fuzzy_blocked_join
from us_flight_bigdata_dashboard_spark.operators.events import q_events_attribution
from us_flight_bigdata_dashboard_spark.operators.graph import (
    q_basket_rules,
    q_graph_khop,
)
from us_flight_bigdata_dashboard_spark.operators.text import q_text_bm25_topk


@pytest.fixture(scope="module")
def attr_dir(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("attr_crafted"))
    # user 1: view, click, purchase(10), purchase(5) -> both credit 'click'
    # user 2: purchase(7) with no prior touch       -> 'direct'
    # user 3: click, error, purchase(2)             -> 'click' (error is not a touch)
    # user 4: view, purchase(1)                     -> 'view'
    rows = [
        (1, "2024-01-01 10:00:00", 1, "view", 0.0),
        (2, "2024-01-01 10:01:00", 1, "click", 0.0),
        (3, "2024-01-01 10:02:00", 1, "purchase", 10.0),
        (4, "2024-01-01 10:03:00", 1, "purchase", 5.0),
        (5, "2024-01-01 11:00:00", 2, "purchase", 7.0),
        (6, "2024-01-01 12:00:00", 3, "click", 0.0),
        (7, "2024-01-01 12:01:00", 3, "error", 0.0),
        (8, "2024-01-01 12:02:00", 3, "purchase", 2.0),
        (9, "2024-01-01 13:00:00", 4, "view", 0.0),
        (10, "2024-01-01 13:01:00", 4, "purchase", 1.0),
    ]
    spark.createDataFrame(
        rows, "event_id bigint, _t string, user_id bigint, event_type string, value double"
    ).selectExpr(
        "event_id", "CAST(_t AS TIMESTAMP) AS ts", "user_id", "event_type", "value",
        "'{}' AS props",
    ).write.mode("overwrite").parquet(os.path.join(root, "events.parquet"))
    return root


def test_attribution_channels(spark, attr_dir):
    got = {
        r["channel"]: (r["n_purchases"], float(r["attributed_value"]))
        for r in q_events_attribution(spark, attr_dir).collect()
    }
    assert got == {
        "click": (3, 17.0),
        "direct": (1, 7.0),
        "view": (1, 1.0),
    }


@pytest.fixture(scope="module")
def path_graph_dir(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("khop_crafted"))
    # path graph: c1 - s1 - c2 - s2 - c3 (c3 sits at hop 4, beyond budget)
    orders = [(1, 1), (2, 2), (3, 2), (4, 3)]  # (o_orderkey, o_custkey)
    lineitem = [(1, 1), (2, 1), (3, 2), (4, 2)]  # (l_orderkey, l_suppkey)
    spark.createDataFrame(orders, "o_orderkey bigint, o_custkey bigint").write.mode(
        "overwrite"
    ).parquet(os.path.join(root, "orders.parquet"))
    spark.createDataFrame(lineitem, "l_orderkey bigint, l_suppkey bigint").write.mode(
        "overwrite"
    ).parquet(os.path.join(root, "lineitem.parquet"))
    return root


def test_khop_path_graph_wavefronts(spark, path_graph_dir):
    got = {
        r["hop"]: r["n_nodes"] for r in q_graph_khop(spark, path_graph_dir).collect()
    }
    # c:1 -> s:1 -> c:2 -> s:2; c:3 is 4 hops out and must NOT appear
    assert got == {0: 1, 1: 1, 2: 1, 3: 1}


@pytest.fixture(scope="module")
def skew_events_dir(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("hh_crafted"))
    # planted skew: 'hot' holds 30/60 rows; 30 singleton types sit far
    # below the 15% support — exactly the regime where the Misra-Gries
    # candidate pass prunes and the exact verify must discard any
    # partition-order-dependent false positives.
    rows = [(i, "2024-01-01 00:00:00", i, "hot", 1.0) for i in range(30)]
    rows += [(100 + i, "2024-01-01 00:01:00", i, f"t{i}", 1.0) for i in range(30)]
    spark.createDataFrame(
        rows, "event_id bigint, _t string, user_id bigint, event_type string, value double"
    ).selectExpr(
        "event_id", "CAST(_t AS TIMESTAMP) AS ts", "user_id", "event_type", "value",
        "'{}' AS props",
    ).write.mode("overwrite").parquet(os.path.join(root, "events.parquet"))
    return root


def test_heavy_hitters_planted_skew(spark, skew_events_dir):
    rows = q_heavy_hitters(spark, skew_events_dir).collect()
    assert len(rows) == 1
    (r,) = rows
    assert (r["event_type"], r["n_events"]) == ("hot", 30)
    assert r["share"] == pytest.approx(0.5, abs=0)


@pytest.fixture(scope="module")
def basket_dir(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("basket_crafted"))
    # baskets: {A,B} ×3, {A} ×1, {B,C} ×1 — only the (A,B) pair clears the
    # support floor of 2. N=5, item_A=4, item_B=4.
    A, B, C = 101, 102, 103
    lineitem = (
        [(1, A), (1, B), (2, A), (2, B), (3, A), (3, B)]
        + [(4, A)]
        + [(5, B), (5, C)]
    )
    spark.createDataFrame(lineitem, "l_orderkey bigint, l_partkey bigint").write.mode(
        "overwrite"
    ).parquet(os.path.join(root, "lineitem.parquet"))
    return root


def test_basket_rules_metrics(spark, basket_dir):
    rows = q_basket_rules(spark, basket_dir).collect()
    # exactly the two directions of A<->B
    assert sorted((r["antecedent"], r["consequent"]) for r in rows) == [
        (101, 102),
        (102, 101),
    ]
    for r in rows:
        assert r["pair_n"] == 3
        assert r["support"] == pytest.approx(3 / 5, abs=0)
        assert r["confidence"] == pytest.approx(3 / 4, abs=0)
        assert r["lift"] == pytest.approx((3 * 5) / (4 * 4), abs=0)


@pytest.fixture(scope="module")
def parts_dir(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("skyline_crafted"))
    # maximize p_size, minimize p_retailprice:
    #   C (20, 90) dominates A (10, 100), its duplicate E, and B (20, 150)
    #   D (5, 80) is cheaper than C -> also on the frontier
    rows = [
        (1, "part a", "B1", "T1", 10, 100.0),
        (2, "part b", "B1", "T1", 20, 150.0),
        (3, "part c", "B1", "T1", 20, 90.0),
        (4, "part d", "B1", "T1", 5, 80.0),
        (5, "part e", "B1", "T1", 10, 100.0),
    ]
    spark.createDataFrame(
        rows,
        "p_partkey bigint, p_name string, p_brand string, p_type string, "
        "p_size int, p_retailprice double",
    ).write.mode("overwrite").parquet(os.path.join(root, "part.parquet"))
    return root


def test_skyline_dominance(spark, parts_dir):
    got = sorted(r["p_partkey"] for r in q_skyline_pareto(spark, parts_dir).collect())
    assert got == [3, 4]


@pytest.fixture(scope="module")
def fuzzy_dir(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("fuzzy_crafted"))
    # "blue bolt" (3 rows) vs "blue bond" (1 row): same block (first token
    # 'blue', len 9 -> bucket 2), Levenshtein 2 -> the ONLY match.
    # "blue xylophone": same token, different length bucket -> blocked out.
    # "red bolt": different block token -> blocked out.
    rows = [
        (1, "blue bolt", "B1", "T1", 1, 1.0),
        (2, "blue bolt", "B1", "T1", 1, 1.0),
        (7, "blue bolt", "B1", "T1", 1, 1.0),
        (3, "blue bond", "B1", "T1", 1, 1.0),
        (4, "blue xylophone", "B1", "T1", 1, 1.0),
        (5, "red bolt", "B1", "T1", 1, 1.0),
    ]
    spark.createDataFrame(
        rows,
        "p_partkey bigint, p_name string, p_brand string, p_type string, "
        "p_size int, p_retailprice double",
    ).write.mode("overwrite").parquet(os.path.join(root, "part.parquet"))
    return root


def test_fuzzy_blocking_and_entity_collapse(spark, fuzzy_dir):
    rows = q_fuzzy_blocked_join(spark, fuzzy_dir).collect()
    assert len(rows) == 1
    (m,) = rows
    assert (m["name_a"], m["name_b"]) == ("blue bolt", "blue bond")
    assert m["edit_distance"] == 2
    # distinct-entity collapse: representative = min key, multiplicity kept
    assert (m["rep_key_a"], m["n_rows_a"]) == (1, 3)
    assert (m["rep_key_b"], m["n_rows_b"]) == (3, 1)


@pytest.fixture(scope="module")
def bm25_dir(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("bm25_crafted"))
    # equal doc lengths (dl=5) so only tf and idf move the score:
    #   d3 matches two rare terms (df=1 each)  -> top
    #   d1 tf(spark)=3 beats d2 tf(spark)=1    -> middle, then low
    #   d4 matches nothing                     -> excluded
    rows = [
        (1, "spark spark spark pad pad"),
        (2, "spark pad pad pad pad"),
        (3, "vector stream pad pad pad"),
        (4, "pad pad pad pad pad"),
    ]
    spark.createDataFrame(rows, "doc_id bigint, text string").write.mode(
        "overwrite"
    ).parquet(os.path.join(root, "documents.parquet"))
    return root


def test_bm25_ordering(spark, bm25_dir):
    rows = q_text_bm25_topk(spark, bm25_dir).collect()
    assert [r["doc_id"] for r in rows] == [3, 1, 2]
    assert [r["rk"] for r in rows] == [1, 2, 3]
    # hand-computed: dl == avgdl so the length norm is exactly 1;
    # d2 score = idf_spark * (1*2.2)/(1+1.2) = 1.0 * 1.0 = 1.0
    assert rows[2]["score"] == pytest.approx(1.0, abs=1e-12)
