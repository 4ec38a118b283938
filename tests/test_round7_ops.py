"""Semantic ground-truth tests for the round-7 operators on crafted data:
planted duplicate substrings, a subset document, fully-separated and
interleaved two-sample distributions, and an engineered bm25+cosine winner.
The driver gate proves cross-engine agreement; these prove the MATH."""

from __future__ import annotations

import os

import pytest

from us_flight_bigdata_dashboard_spark.operators.dedup import (
    SPAN_GRAM_TOKENS,
    q_dedup_containment,
    q_dedup_substring_spans,
)
from us_flight_bigdata_dashboard_spark.operators.statistics import (
    q_ab_cuped,
    q_ks_two_sample,
    q_mann_whitney_u,
)
from us_flight_bigdata_dashboard_spark.operators.text import (
    RRF_K,
    q_retrieval_rrf_fusion,
)


def _write_docs(spark, root, docs):
    spark.createDataFrame(
        docs, "doc_id bigint, text string, lang string, source string, n_chars bigint"
    ).write.mode("overwrite").parquet(os.path.join(root, "documents.parquet"))


@pytest.fixture(scope="module")
def span_dir(spark, tmp_path_factory):
    assert SPAN_GRAM_TOKENS == 6, "expected spans below are derived for L=6"
    root = str(tmp_path_factory.mktemp("span_crafted"))
    # doc 0: 10 unique tokens — no duplicated anchor anywhere
    d0 = "a0 a1 a2 a3 a4 a5 a6 a7 a8 a9"
    # docs 1 and 2 share an identical 8-token run (w1..w8) at different
    # offsets; anchors of 6 inside the run merge to exactly that run
    d1 = "x1 x2 w1 w2 w3 w4 w5 w6 w7 w8 y1 y2"  # run at tokens 3..10
    d2 = "z1 z2 z3 w1 w2 w3 w4 w5 w6 w7 w8 z4"  # run at tokens 4..11
    # doc 3: the same 6-token run appears twice WITHIN the doc
    d3 = "r1 r2 r3 r4 r5 r6 q1 q2 r1 r2 r3 r4 r5 r6"  # spans 1..6 and 9..14
    _write_docs(
        spark,
        root,
        [
            (0, d0, "en", "s0", len(d0)),
            (1, d1, "en", "s0", len(d1)),
            (2, d2, "en", "s1", len(d2)),
            (3, d3, "en", "s1", len(d3)),
        ],
    )
    return root


def test_substring_spans_ground_truth(spark, span_dir):
    rows = {r["doc_id"]: r for r in q_dedup_substring_spans(spark, span_dir).collect()}
    assert rows[0]["n_dup_spans"] == 0 and rows[0]["dup_tokens"] == 0
    assert rows[0]["dup_frac"] == 0.0
    # cross-doc shared 8-token run → one merged span of exactly 8 tokens
    assert rows[1]["n_dup_spans"] == 1 and rows[1]["dup_tokens"] == 8
    assert rows[2]["n_dup_spans"] == 1 and rows[2]["dup_tokens"] == 8
    assert rows[1]["n_tokens"] == 12 and rows[1]["dup_frac"] == 8.0 / 12.0
    # within-doc repeat → BOTH occurrences flagged, two disjoint spans
    assert rows[3]["n_dup_spans"] == 2 and rows[3]["dup_tokens"] == 12


@pytest.fixture(scope="module")
def contain_dir(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("contain_crafted"))
    a = "c1 c2 c3 c4 c5"  # 3 distinct 3-gram shingles, all inside b
    b = "c1 c2 c3 c4 c5 c6 c7"  # 5 shingles
    other = "u1 u2 u3 u4 u5 u6"
    _write_docs(
        spark,
        root,
        [
            (0, a, "en", "s0", len(a)),
            (1, b, "en", "s0", len(b)),
            (2, other, "en", "s1", len(other)),
        ],
    )
    return root


def test_containment_detects_subset_doc(spark, contain_dir):
    rows = q_dedup_containment(spark, contain_dir).collect()
    pairs = {(r["doc_a"], r["doc_b"]): r for r in rows}
    # every shingle of doc 0 occurs in doc 1 → containment 1.0
    assert (0, 1) in pairs
    r = pairs[(0, 1)]
    assert r["n_common"] == 3 and r["n_a"] == 3 and r["n_b"] == 5
    assert r["containment"] == 1.0
    # reverse direction is 3/5 = 0.6 < 0.8 → filtered; unrelated doc absent
    assert (1, 0) not in pairs
    assert not any(2 in p for p in pairs)


def _write_orders(spark, root, urgent_vals, other_vals):
    rows = []
    for i, v in enumerate(urgent_vals):
        rows.append((i, 1, "O", float(v), "1997-01-01 00:00:00", "1-URGENT"))
    for j, v in enumerate(other_vals):
        rows.append((1000 + j, 1, "O", float(v), "1997-01-01 00:00:00", "5-LOW"))
    spark.createDataFrame(
        rows,
        "o_orderkey bigint, o_custkey bigint, o_orderstatus string, "
        "o_totalprice double, _d string, o_orderpriority string",
    ).selectExpr(
        "o_orderkey",
        "o_custkey",
        "o_orderstatus",
        "o_totalprice",
        "CAST(_d AS TIMESTAMP) AS o_orderdate",
        "o_orderpriority",
    ).write.mode("overwrite").parquet(os.path.join(root, "orders.parquet"))


def test_ks_fully_separated_and_interleaved(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("ks_sep"))
    _write_orders(spark, root, [1, 2, 3], [4, 5, 6])
    row = q_ks_two_sample(spark, root).collect()[0]
    assert (row["n1"], row["n2"]) == (3, 3)
    assert row["d_num"] == 9 and row["d_stat"] == 1.0  # disjoint supports → D = 1

    root2 = str(tmp_path_factory.mktemp("ks_mix"))
    _write_orders(spark, root2, [1, 3], [2, 4])
    row2 = q_ks_two_sample(spark, root2).collect()[0]
    # ECDF gap peaks at v=1 and v=3: |1*2 - 0*2| = 2 → D = 2/4
    assert row2["d_num"] == 2 and row2["d_stat"] == 0.5


def test_mann_whitney_extremes_and_ties(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("mw_lo"))
    _write_orders(spark, root, [1, 2], [3, 4])
    row = q_mann_whitney_u(spark, root).collect()[0]
    assert row["u1_x2"] == 0 and row["auc"] == 0.0  # urgent strictly below

    root2 = str(tmp_path_factory.mktemp("mw_hi"))
    _write_orders(spark, root2, [3, 4], [1, 2])
    row2 = q_mann_whitney_u(spark, root2).collect()[0]
    assert row2["u1_x2"] == 2 * 4 and row2["auc"] == 1.0  # strictly above

    root3 = str(tmp_path_factory.mktemp("mw_tie"))
    _write_orders(spark, root3, [7], [7])
    row3 = q_mann_whitney_u(spark, root3).collect()[0]
    # single tied value → midrank 1.5 each → U1 = 0.5 → AUC exactly 1/2
    assert row3["u1_x2"] == 1 and row3["auc"] == 0.5


def test_cuped_perfect_covariate_equalizes_arms(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("cuped_crafted"))
    # post = 2·pre exactly for every user → θ = 2 and BOTH adjusted arm
    # means collapse to 2·global_mean_pre = 50 (the whole point of CUPED:
    # a perfectly predictive covariate removes all between-arm noise)
    rows = []
    for uid, pre in [(0, 10.0), (1, 20.0), (2, 30.0), (3, 40.0)]:
        rows.append((uid * 2, "2024-01-10 00:00:00", uid, "view", pre, "{}"))
        rows.append((uid * 2 + 1, "2024-01-20 00:00:00", uid, "view", 2.0 * pre, "{}"))
    spark.createDataFrame(
        rows,
        "event_id bigint, _t string, user_id bigint, event_type string, "
        "value double, props string",
    ).selectExpr(
        "event_id", "CAST(_t AS TIMESTAMP) AS ts", "user_id", "event_type", "value", "props"
    ).write.mode("overwrite").parquet(os.path.join(root, "events.parquet"))

    got = {r["arm"]: r for r in q_ab_cuped(spark, root).collect()}
    assert got[0]["n_users"] == 2 and got[1]["n_users"] == 2
    assert got[0]["theta"] == 2.0 and got[1]["theta"] == 2.0
    assert got[0]["mean_post"] == 40.0 and got[1]["mean_post"] == 60.0
    assert got[0]["mean_adj"] == 50.0 and got[1]["mean_adj"] == 50.0


@pytest.fixture(scope="module")
def rrf_dir(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("rrf_crafted"))
    # doc 1 is the engineered winner: saturated bm25 terms AND the nearest
    # embedding to query vector 0; docs 4/5 are lexical-only and dense-only
    docs = [
        (0, "filler words only here", "en", "s0", 22),
        (1, "spark vector stream spark vector stream spark", "en", "s0", 46),
        (2, "spark appears once amid much other padding text", "en", "s0", 48),
        (3, "no relevant terms at all in this document body", "en", "s1", 47),
        (4, "vector stream vector stream vector", "en", "s1", 35),
        (5, "nothing lexical matches for this one either", "en", "s1", 44),
    ]
    _write_docs(spark, root, docs)
    base = [1.0] + [0.0] * 63
    near = [0.99] + [0.01] * 63  # highest cosine vs base
    mid = [0.5] * 64
    far = [-1.0] + [0.0] * 63
    vecs = [
        (0, base, 0),
        (1, near, 0),
        (2, far, 1),
        (3, mid, 1),
        (4, far, 1),
        (5, mid, 0),
    ]
    spark.createDataFrame(
        vecs, "vec_id bigint, embedding array<float>, label int"
    ).write.mode("overwrite").parquet(os.path.join(root, "embeddings.parquet"))
    return root


def test_rrf_fuses_both_lists(spark, rrf_dir):
    rows = q_retrieval_rrf_fusion(spark, rrf_dir).collect()
    by_id = {r["doc_id"]: r for r in rows}
    # doc 1 tops both lists → fused rank 1 with both contributions present
    top = rows[0]
    assert top["doc_id"] == 1 and top["fused_rank"] == 1
    assert top["bm25_rank"] == 1 and top["cos_rank"] == 1
    assert top["rrf_score"] == 1.0 / (RRF_K + 1.0) + 1.0 / (RRF_K + 1.0)
    # lexical-only doc 4: present with a cos_rank too (tiny corpus) or not —
    # but its bm25 contribution must place it above pure-dense doc 3's
    # lexical contribution (doc 3 has no query terms → no bm25 rank)
    assert by_id[4]["bm25_rank"] is not None
    assert by_id[3]["bm25_rank"] is None and by_id[3]["cos_rank"] is not None
    # every fused score recomputes from its rank components
    for r in rows:
        expect = 0.0
        if r["bm25_rank"] is not None:
            expect += 1.0 / (RRF_K + float(r["bm25_rank"]))
        if r["cos_rank"] is not None:
            expect += 1.0 / (RRF_K + float(r["cos_rank"]))
        assert r["rrf_score"] == expect
