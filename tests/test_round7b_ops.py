"""Ground-truth tests for the round-7 text/linkage operators: hand-computed
add-k bigram LM scores and a planted transposition that full
Damerau–Levenshtein must count as ONE edit (Levenshtein counts two)."""

from __future__ import annotations

import os

import pytest

from us_flight_bigdata_dashboard_spark.operators.dedup import q_fuzzy_damerau_linkage
from us_flight_bigdata_dashboard_spark.operators.graph import (
    q_graph_link_prediction,
    q_graph_shortest_paths,
)
from us_flight_bigdata_dashboard_spark.operators.sketches import (
    q_sketch_cms_freq,
    q_sketch_hll_registers,
)
from us_flight_bigdata_dashboard_spark.operators.text import q_text_bigram_lm_score


@pytest.fixture(scope="module")
def lm_dir(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("r7_lm"))
    # Corpus: "aaaaa" (4×'aa') and "ab" (1×'ab').
    # Model: c_aa=4, c_ab=1; context c_a=5; V={a,b}=2; k=0.5.
    # p(aa) = 4.5/6 = 0.75 → doc 1 score 0.75; p(ab) = 1.5/6 = 0.25.
    spark.createDataFrame(
        [(1, "aaaaa", "en", "s", 5), (2, "ab", "en", "s", 2)],
        "doc_id bigint, text string, lang string, source string, n_chars bigint",
    ).write.mode("overwrite").parquet(os.path.join(root, "documents.parquet"))
    return root


def test_bigram_lm_hand_computed(spark, lm_dir):
    rows = {r["doc_id"]: r for r in q_text_bigram_lm_score(spark, lm_dir).collect()}
    assert rows[1]["n_bigrams"] == 4
    assert rows[1]["lm_score"] == pytest.approx(0.75, abs=1e-12)
    assert rows[2]["n_bigrams"] == 1
    assert rows[2]["lm_score"] == pytest.approx(0.25, abs=1e-12)


@pytest.fixture(scope="module")
def link_dir(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("r7_link"))
    # Same blocking key (first token "blue", same length bucket):
    # "blue thecat" vs "blue htecat" differ by ONE adjacent transposition.
    spark.createDataFrame(
        [
            (1, "blue thecat"),
            (2, "blue htecat"),
            (3, "red unrelated name"),
        ],
        "p_partkey bigint, p_name string",
    ).write.mode("overwrite").parquet(os.path.join(root, "part.parquet"))
    return root


def test_damerau_counts_transposition_once(spark, link_dir):
    rows = q_fuzzy_damerau_linkage(spark, link_dir).collect()
    assert len(rows) == 1
    r = rows[0]
    assert {r["name_a"], r["name_b"]} == {"blue thecat", "blue htecat"}
    assert r["dl_distance"] == 1  # transposition = one edit
    assert r["lev_distance"] == 2  # plain Levenshtein needs two


@pytest.fixture(scope="module")
def sssp_dir(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("r7_sssp"))
    # Bipartite customer(c)–supplier(s) weighted graph via lineitem/orders.
    # c1 —5— s1 —(via c2)— ... : c1-s1 w=5, c1-s2 w=20, c2-s1 w=1, c2-s2 w=2.
    # Cheapest c1→s2 is 5+1+2 = 8 via s1,c2 — shorter than the direct 20.
    li = [
        (10, 1, 5.0), (11, 2, 20.0), (12, 1, 1.0), (13, 2, 2.0),
    ]
    spark.createDataFrame(
        [(o, o, s, 1, q, 100.0, 0.0, 0.0, "N", "O", "1995-01-01 00:00:00") for o, s, q in li],
        "l_orderkey bigint, l_partkey bigint, l_suppkey bigint, l_linenumber int,"
        " l_quantity double, l_extendedprice double, l_discount double, l_tax double,"
        " l_returnflag string, l_linestatus string, _d string",
    ).selectExpr(
        "l_orderkey", "l_partkey", "l_suppkey", "l_linenumber", "l_quantity",
        "l_extendedprice", "l_discount", "l_tax", "l_returnflag", "l_linestatus",
        "CAST(_d AS TIMESTAMP) AS l_shipdate",
    ).write.mode("overwrite").parquet(os.path.join(root, "lineitem.parquet"))
    spark.createDataFrame(
        [(10, 1), (11, 1), (12, 2), (13, 2)],
        "o_orderkey bigint, o_custkey bigint",
    ).write.mode("overwrite").parquet(os.path.join(root, "orders.parquet"))
    return root


def test_sssp_relaxes_through_cheaper_path(spark, sssp_dir):
    rows = {r["node"]: r["dist"] for r in q_graph_shortest_paths(spark, sssp_dir).collect()}
    assert rows["c:1"] == 0
    assert rows["s:1"] == 5
    assert rows["c:2"] == 6  # 5 + 1 back to c2
    assert rows["s:2"] == 8  # 5+1+2 beats the direct 20


def test_rake_extracts_planted_keyphrase(spark, tmp_path_factory):
    # "machine learning systems" is a 3-word content phrase repeated
    # twice; RAKE must rank it above the isolated single words.
    import os as _os

    from us_flight_bigdata_dashboard_spark.operators.text import (
        q_text_rake_keywords,
    )

    root = str(tmp_path_factory.mktemp("r7_rake"))
    text = (
        "machine learning systems are the future of machine learning systems "
        "and the cat sat on a mat"
    )
    spark.createDataFrame(
        [(1, text, "en", "s", len(text))],
        "doc_id bigint, text string, lang string, source string, n_chars bigint",
    ).write.mode("overwrite").parquet(_os.path.join(root, "documents.parquet"))
    rows = q_text_rake_keywords(spark, root).collect()
    assert rows[0]["rank"] == 1
    assert rows[0]["phrase"] == "machine learning systems"
    assert rows[0]["n_words"] == 3


def test_cms_one_sided_guarantee(spark):
    # Count-Min can only OVERestimate — on every probed key
    rows = q_sketch_cms_freq(spark, "/root/testdata/sf0.001").collect()
    assert len(rows) == 10
    for r in rows:
        assert r["overestimate"] >= 0
        assert r["cms_est"] == r["exact_cnt"] + r["overestimate"]


def test_hll_raw_estimate_in_band(spark):
    # at sf0.01, n/m ≈ 5 clears the small-range zone → raw within 25%
    # and the linear-counting gate must NOT fire (hll_est == raw).
    rows = q_sketch_hll_registers(spark, "/root/testdata/sf0.01").collect()
    assert rows
    for r in rows:
        assert abs(r["rel_err_pct"]) < 25.0
        assert r["hll_raw_est"] > 0
        assert r["hll_est"] == r["hll_raw_est"]
        # zero_regs is the linear-counting input: exact and within range
        assert 0 <= r["zero_regs"] <= 256


def test_hll_linear_counting_small_range(spark, tmp_path_factory):
    # Crafted small-range case (VERDICT r7 ask #7): n ≪ m is exactly where
    # the raw HLL estimator is biased high and linear counting m·ln(m/V)
    # wins. 40 distinct keys against m=256 registers must (a) trigger the
    # LUT correction, (b) beat the raw estimate, (c) land within 25%.
    import os

    root = str(tmp_path_factory.mktemp("hll_lc"))
    rows = [("1-URGENT", k) for k in range(1, 41) for _ in (0, 1)]
    spark.createDataFrame(
        rows, "o_orderpriority string, o_custkey bigint"
    ).write.mode("overwrite").parquet(os.path.join(root, "orders.parquet"))
    out = q_sketch_hll_registers(spark, root).collect()
    assert len(out) == 1
    r = out[0]
    assert r["exact_distinct"] == 40
    assert r["hll_est"] != r["hll_raw_est"], "LC correction did not fire"
    assert abs(r["rel_err_corr_pct"]) < abs(r["rel_err_pct"])
    assert abs(r["rel_err_corr_pct"]) < 25.0


def test_matryoshka_full_dim_is_perfect_reference(spark):
    from us_flight_bigdata_dashboard_spark.operators.similarity import (
        q_embedding_matryoshka_eval,
    )

    rows = q_embedding_matryoshka_eval(spark, "/root/testdata/sf0.001").collect()
    assert rows
    for r in rows:
        assert 0 <= r["overlap_at5"] <= 5
        if r["dim"] == 64:  # the reference compared to itself: exact recall
            assert r["overlap_at5"] == 5 and r["top1_match"] == 1


def test_link_prediction_scoring_algebra(spark):
    # cross-engine values are covered by the oracle gate; here assert the
    # scoring algebra holds on every emitted row at sf0.001
    rows = q_graph_link_prediction(spark, "/root/testdata/sf0.001").collect()
    assert rows, "expected at least one predicted link"
    for r in rows:
        cn, da, db = r["common_neighbors"], r["deg_a"], r["deg_b"]
        assert r["jaccard"] == pytest.approx(cn / (da + db - cn), abs=1e-12)
        assert cn >= 1
