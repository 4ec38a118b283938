"""Ground-truth tests for the round-8 operators: business-day arithmetic
against a day-by-day brute force, planted ANOVA/SRM/l-diversity effects,
hand-computed collocation lift and journey trigrams, and SALSA mass
conservation on a crafted bipartite graph."""

from __future__ import annotations

import datetime as dt
import os

import pytest

SF_DIR = "/root/testdata/sf0.001"


def _write(spark, root, name, rows, schema):
    spark.createDataFrame(rows, schema).write.mode("overwrite").parquet(
        os.path.join(root, f"{name}.parquet")
    )


# ---------------------------------------------------------------------------
# business_days_lag
# ---------------------------------------------------------------------------


def _brute_business_days(o: dt.date, s: dt.date) -> int:
    n, d = 0, o + dt.timedelta(days=1)
    while d <= s:
        if d.weekday() < 5:
            n += 1
        d += dt.timedelta(days=1)
    return n


def test_business_days_matches_brute_force(spark, tmp_path_factory):
    import random

    from us_flight_bigdata_dashboard_spark.operators.temporal import (
        q_business_days_lag,
    )

    root = str(tmp_path_factory.mktemp("bizdays"))
    rng = random.Random(7)
    orders, lines, expected = [], [], []
    for i in range(60):
        o = dt.date(1995, 1, 1) + dt.timedelta(days=rng.randint(0, 2000))
        s = o + dt.timedelta(days=rng.randint(0, 40))
        orders.append((i, 1, "O", 100.0, dt.datetime.combine(o, dt.time()), "1-URGENT"))
        lines.append((i, dt.datetime.combine(s, dt.time())))
        expected.append(_brute_business_days(o, s))
    _write(
        spark, root, "orders", orders,
        "o_orderkey bigint, o_custkey bigint, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    )
    _write(spark, root, "lineitem", lines, "l_orderkey bigint, l_shipdate timestamp")
    (row,) = q_business_days_lag(spark, root).collect()
    assert row["n_lines"] == 60
    assert row["min_lag"] == min(expected)
    assert row["max_lag"] == max(expected)
    assert row["avg_biz_days"] == pytest.approx(sum(expected) / 60, abs=1e-12)


# ---------------------------------------------------------------------------
# anova / levene: planted shift and spread
# ---------------------------------------------------------------------------


def _li_rows(flag_qty_pairs):
    rows = []
    for i, (flag, q) in enumerate(flag_qty_pairs):
        rows.append(
            (i, 1, 1, 1, float(q), 100.0, 0.0, 0.0, flag, "O",
             dt.datetime(1995, 1, 2))
        )
    return rows


_LI_SCHEMA = (
    "l_orderkey bigint, l_partkey bigint, l_suppkey bigint, l_linenumber int, "
    "l_quantity double, l_extendedprice double, l_discount double, l_tax double, "
    "l_returnflag string, l_linestatus string, l_shipdate timestamp"
)


def test_anova_detects_planted_mean_shift(spark, tmp_path_factory):
    from us_flight_bigdata_dashboard_spark.operators.inference import q_anova_oneway

    root = str(tmp_path_factory.mktemp("anova"))
    # A ~ {10,12}, N ~ {10,12}, R ~ {40,42}: huge between-group spread
    pairs = [("A", 10), ("A", 12)] * 20 + [("N", 10), ("N", 12)] * 20 + [
        ("R", 40), ("R", 42)
    ] * 20
    _write(spark, root, "lineitem", _li_rows(pairs), _LI_SCHEMA)
    (row,) = q_anova_oneway(spark, root).collect()
    assert row["k"] == 3 and row["n_rows"] == 120
    assert row["f_stat"] > 100, row
    assert 0.9 < row["eta_sq"] <= 1.0
    # hand-check SSB/SSW: group means 11/11/41, grand 21; within dev ±1
    assert row["ss_within"] == pytest.approx(120.0)
    assert row["ss_between"] == pytest.approx(2 * 40 * 100 + 40 * 400)


def test_levene_detects_planted_spread_difference(spark, tmp_path_factory):
    from us_flight_bigdata_dashboard_spark.operators.inference import (
        q_levene_brown_forsythe,
    )

    root = str(tmp_path_factory.mktemp("levene"))
    # same medians (25) but R has far wider spread
    pairs = ([("A", 24), ("A", 25), ("A", 26)] * 20
             + [("N", 24), ("N", 25), ("N", 26)] * 20
             + [("R", 1), ("R", 25), ("R", 49)] * 20)
    _write(spark, root, "lineitem", _li_rows(pairs), _LI_SCHEMA)
    (row,) = q_levene_brown_forsythe(spark, root).collect()
    assert row["w_stat"] > 100, row


# ---------------------------------------------------------------------------
# srm / l-diversity
# ---------------------------------------------------------------------------


def test_srm_counts_match_python_md5(spark):
    import hashlib

    from us_flight_bigdata_dashboard_spark.operators.inference import q_ab_srm_check
    from us_flight_bigdata_dashboard_spark.sources.catalog import load_table

    (row,) = q_ab_srm_check(spark, SF_DIR).collect()
    users = {
        r["user_id"]
        for r in load_table(spark, SF_DIR, "events").select("user_id").distinct().collect()
    }
    arms = [int(hashlib.md5(str(u).encode()).hexdigest()[:15], 16) % 2 for u in users]
    n1 = sum(arms)
    assert row["n0"] == len(users) - n1 and row["n1"] == n1
    d, n = row["n0"] - row["n1"], row["n0"] + row["n1"]
    assert row["chi_square"] == pytest.approx(d * d / n)
    assert row["srm_flag"] == int(d * d * 10**5 > 384146 * n)


def test_ldiversity_flags_homogeneous_class(spark, tmp_path_factory):
    from us_flight_bigdata_dashboard_spark.operators.audit import q_ldiversity_audit

    root = str(tmp_path_factory.mktemp("ldiv"))
    rows = []
    # class (BUILDING, 1): 10 rows ALL in one balance bracket → l = 1
    for i in range(10):
        rows.append((i, f"Customer#{i:09d}", 1, 500.0, "BUILDING"))
    # class (MACHINERY, 2): 3 distinct brackets → l = 3, safe
    for i in range(10, 19):
        rows.append((i, f"Customer#{i:09d}", 2, float((i % 3) * 1000 + 10), "MACHINERY"))
    _write(
        spark, root, "customer", rows,
        "c_custkey bigint, c_name string, c_nationkey int, c_acctbal double, "
        "c_mktsegment string",
    )
    out = {r["c_mktsegment"]: r for r in q_ldiversity_audit(spark, root).collect()}
    assert out["BUILDING"]["min_l"] == 1
    assert out["BUILDING"]["n_low_diversity"] == 1
    assert out["BUILDING"]["rows_exposed"] == 10
    assert out["MACHINERY"]["min_l"] == 3
    assert out["MACHINERY"]["n_low_diversity"] == 0


# ---------------------------------------------------------------------------
# collocations / zipf / trigrams
# ---------------------------------------------------------------------------


def test_collocation_lift_hand_computed(spark, tmp_path_factory):
    from us_flight_bigdata_dashboard_spark.operators.text import (
        q_text_collocations_lift,
    )

    root = str(tmp_path_factory.mktemp("colloc"))
    # "a b" always adjacent (5 times); "c d" co-occur but only 5 adjacencies
    # diluted among frequent c/d unigrams elsewhere
    docs = [(i, "a b c d c c d d", "en", "s", 10) for i in range(5)]
    _write(
        spark, root, "documents", docs,
        "doc_id bigint, text string, lang string, source string, n_chars bigint",
    )
    rows = q_text_collocations_lift(spark, root).collect()
    by_pair = {(r["w1"], r["w2"]): r for r in rows}
    # per doc: 7 bigrams, 8 tokens. c_ab for (a,b)=5; c_a=5, c_b=5; B=35, U=40
    r = by_pair[("a", "b")]
    assert r["c_ab"] == 5 and r["c_a"] == 5 and r["c_b"] == 5
    assert r["lift"] == pytest.approx((5 / 35) / ((5 / 40) * (5 / 40)))
    # (a,b) with lift 9.14 must outrank (c,d): c_cd=10, c_c=c_d=15
    assert rows[0]["w1"] == "a" and rows[0]["w2"] == "b"
    assert by_pair[("c", "d")]["lift"] < r["lift"]


def test_zipf_rank_and_product(spark, tmp_path_factory):
    from us_flight_bigdata_dashboard_spark.operators.text import q_text_zipf_rankfreq

    root = str(tmp_path_factory.mktemp("zipf"))
    docs = [(0, "x x x x y y z", "en", "s", 10)]
    _write(
        spark, root, "documents", docs,
        "doc_id bigint, text string, lang string, source string, n_chars bigint",
    )
    rows = q_text_zipf_rankfreq(spark, root).collect()
    assert [(r["rank"], r["w"], r["freq"], r["rank_x_freq"]) for r in rows] == [
        (1, "x", 4, 4),
        (2, "y", 2, 4),
        (3, "z", 1, 3),
    ]
    assert rows[0]["share"] == pytest.approx(4 / 7)


def test_path_trigrams_hand_computed(spark, tmp_path_factory):
    from us_flight_bigdata_dashboard_spark.operators.events import (
        q_events_path_trigrams,
    )

    root = str(tmp_path_factory.mktemp("tri"))
    base = dt.datetime(2024, 1, 1)
    rows = []
    # user 1: v,c,p,v → trigrams (v,c,p), (c,p,v); user 2: v,c,p → (v,c,p)
    seq = [(1, ["view", "click", "purchase", "view"]), (2, ["view", "click", "purchase"])]
    eid = 0
    for uid, types in seq:
        for j, t in enumerate(types):
            rows.append((eid, base + dt.timedelta(minutes=j), uid, t, 1.0, "{}"))
            eid += 1
    _write(
        spark, root, "events", rows,
        "event_id bigint, ts timestamp, user_id bigint, event_type string, "
        "value double, props string",
    )
    out = {(r["t1"], r["t2"], r["t3"]): r for r in q_events_path_trigrams(spark, root).collect()}
    assert out[("view", "click", "purchase")]["n_paths"] == 2
    assert out[("click", "purchase", "view")]["n_paths"] == 1
    assert out[("view", "click", "purchase")]["share"] == pytest.approx(2 / 3)


# ---------------------------------------------------------------------------
# salsa
# ---------------------------------------------------------------------------


def test_salsa_mass_conservation_and_hub_dominance(spark, tmp_path_factory):
    from us_flight_bigdata_dashboard_spark.operators.graph import (
        SALSA_FP,
        q_graph_salsa,
    )

    root = str(tmp_path_factory.mktemp("salsa"))
    # customers 1..6 all buy from supplier 100; only customer 1 buys from 200
    orders, lines = [], []
    ok = 0
    for cust in range(1, 7):
        supps = [100] if cust > 1 else [100, 200]
        for sp in supps:
            orders.append((ok, cust, "O", 10.0, dt.datetime(1995, 1, 2), "5-LOW"))
            lines.append(
                (ok, 1, sp, 1, 1.0, 10.0, 0.0, 0.0, "N", "O", dt.datetime(1995, 1, 5))
            )
            ok += 1
    _write(
        spark, root, "orders", orders,
        "o_orderkey bigint, o_custkey bigint, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    )
    _write(spark, root, "lineitem", lines, _LI_SCHEMA)
    rows = q_graph_salsa(spark, root).collect()
    by_supp = {r["supp"]: r for r in rows}
    # stochastic walk conserves mass up to DIV truncation (< 1 per term)
    total = sum(r["authority_fp"] for r in rows)
    assert SALSA_FP * 0.99 <= total <= SALSA_FP
    # Lempel-Moran: within one connected component the authority walk's
    # stationary mass is INDEGREE-proportional — 6/7 vs 1/7 here, and the
    # iteration must already be close after 3 alternations
    assert by_supp[100]["indeg"] == 6 and by_supp[200]["indeg"] == 1
    assert by_supp[100]["authority"] == pytest.approx(6 / 7, rel=0.02)
    assert by_supp[200]["authority"] == pytest.approx(1 / 7, rel=0.1)


# ---------------------------------------------------------------------------
# binary quantization / forecast metrics
# ---------------------------------------------------------------------------


def test_binary_quant_codes_and_selfrecall(spark, tmp_path_factory):
    from us_flight_bigdata_dashboard_spark.operators.similarity import (
        q_embedding_binary_quant,
    )

    root = str(tmp_path_factory.mktemp("bq"))
    # vec 0 and vec 1 are sign-identical (Hamming 0); vec 2 flips all dims.
    # filler vecs keep the pool big enough for top-5.
    import math

    def unit(v):
        n = math.sqrt(sum(x * x for x in v))
        return [x / n for x in v]

    base = [0.1 * ((i % 5) - 2) + 0.05 for i in range(64)]  # mixed signs
    rows = [
        (0, unit(base), 0),
        (1, unit([x * 2 for x in base]), 0),           # same signs as 0
        (2, unit([-x for x in base]), 1),              # all signs flipped
    ] + [
        (3 + j, unit([x + 0.02 * j for x in base]), 2) for j in range(6)
    ]
    _write(spark, root, "embeddings", rows, "vec_id bigint, embedding array<float>, label int")
    out = {r["query_id"]: r for r in q_embedding_binary_quant(spark, root).collect()}
    # probe 0: its cosine-nearest is vec 1 (same direction), which is also
    # Hamming-nearest (distance 0) — recall must include that hit
    assert out[0]["n_truth"] == 5
    assert out[0]["n_hits"] >= 1
    assert 0.0 <= out[0]["recall"] <= 1.0


def test_mase_hand_computed(spark, tmp_path_factory):
    from us_flight_bigdata_dashboard_spark.operators.events import (
        q_forecast_mase_smape,
    )

    root = str(tmp_path_factory.mktemp("mase"))
    # 9 days of "view" counts: 10,12,10,12,10,12,10, then 11,13 —
    # seasonal-naive (lag 7) forecasts days 8,9 as 10,12 → abs errs 1,1
    counts = [10, 12, 10, 12, 10, 12, 10, 11, 13]
    rows, eid = [], 0
    for d, c in enumerate(counts):
        for _ in range(c):
            rows.append(
                (eid, dt.datetime(2024, 1, 1 + d, 12, 0, eid % 60), 1, "view", 1.0, "{}")
            )
            eid += 1
    _write(
        spark, root, "events", rows,
        "event_id bigint, ts timestamp, user_id bigint, event_type string, "
        "value double, props string",
    )
    (row,) = q_forecast_mase_smape(spark, root).collect()
    assert row["n_eval_days"] == 2 and row["sum_abs_err"] == 2
    # one-step diffs: |12-10|x6 ... day2..day9 diffs: 2,2,2,2,2,2,1,2 = 15 over 8
    assert row["n_insample"] == 8 and row["sum_d1"] == 15
    assert row["mase"] == pytest.approx((2 / 2) / (15 / 8))
    smape_expected = (2 * 1 / 21 + 2 * 1 / 25) / 2
    assert row["smape"] == pytest.approx(smape_expected, abs=1e-9)


# ---------------------------------------------------------------------------
# skyline / matview delta
# ---------------------------------------------------------------------------


def test_skyline_keeps_frontier_and_duplicate_ties(spark, tmp_path_factory):
    from us_flight_bigdata_dashboard_spark.operators.decision import (
        q_pareto_skyline_suppliers,
    )

    root = str(tmp_path_factory.mktemp("skyline"))
    # one line per supplier: unit price = extendedprice/qty, lag = ship-order
    # supplier: (price, lag): 1:(10,5) 2:(20,1) 3:(15,3) frontier;
    # 4:(16,4) dominated by 3; 5:(10,5) exact twin of 1 -> co-survives
    specs = {1: (10, 5), 2: (20, 1), 3: (15, 3), 4: (16, 4), 5: (10, 5)}
    orders, lines = [], []
    for sk, (price, lag) in specs.items():
        orders.append((sk, 1, "O", 100.0, dt.datetime(1995, 1, 2), "5-LOW"))
        lines.append(
            (sk, 1, sk, 1, 1.0, float(price), 0.0, 0.0, "N", "O",
             dt.datetime(1995, 1, 2) + dt.timedelta(days=lag))
        )
    _write(
        spark, root, "orders", orders,
        "o_orderkey bigint, o_custkey bigint, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    )
    _write(spark, root, "lineitem", lines, _LI_SCHEMA)
    kept = sorted(r["l_suppkey"] for r in q_pareto_skyline_suppliers(spark, root).collect())
    assert kept == [1, 2, 3, 5], kept


def test_matview_delta_equals_recompute(spark, tmp_path_factory):
    from us_flight_bigdata_dashboard_spark.operators.mutation import (
        MV_DEL_MOD,
        MV_INS_MOD,
        q_matview_delta_maintenance,
    )

    root = str(tmp_path_factory.mktemp("matview"))
    # keys 0..199 incl. key 0 (both delete AND insert-source) — the
    # double-membership case the oracle once under-counted
    orders = [
        (k, 1, "O", float(100 + k), dt.datetime(1995, 1, 2), "5-LOW")
        for k in range(200)
    ]
    _write(
        spark, root, "orders", orders,
        "o_orderkey bigint, o_custkey bigint, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    )
    (row,) = q_matview_delta_maintenance(spark, root).collect()
    keys = list(range(200))
    kept = [k for k in keys if k % MV_DEL_MOD != 0]
    ins = [k for k in keys if k % MV_INS_MOD == 0]
    exp_n = len(kept) + len(ins)
    exp_cents = sum((100 + k) * 100 for k in kept) + sum(
        (110 + k) * 100 for k in ins
    )
    assert row["n_orders"] == exp_n
    assert row["revenue_cents"] == exp_cents
    assert row["n_delta_rows"] == len([k for k in keys if k % MV_DEL_MOD == 0]) + len(ins)


# ---------------------------------------------------------------------------
# contamination / boxplot
# ---------------------------------------------------------------------------


def test_contamination_planted_overlap(spark, tmp_path_factory):
    from us_flight_bigdata_dashboard_spark.operators.text import (
        q_benchmark_contamination,
    )

    root = str(tmp_path_factory.mktemp("contam"))
    bench_text = "alpha beta gamma delta epsilon zeta"
    docs = [
        (0, bench_text, "en", "src0", 30),                       # benchmark
        (1, "x " + bench_text + " y", "en", "src1", 30),         # contains it
        (2, "one two three four five six seven", "en", "src1", 30),  # clean
        (3, "alpha beta gamma delta epsilon", "en", "src2", 30),  # exact 5-gram
    ]
    _write(
        spark, root, "documents", docs,
        "doc_id bigint, text string, lang string, source string, n_chars bigint",
    )
    out = {r["source"]: r for r in q_benchmark_contamination(spark, root).collect()}
    # doc 1 shares two 5-grams windows (alpha..epsilon, beta..zeta)
    assert out["src1"]["n_contaminated"] == 1 and out["src1"]["n_docs"] == 2
    assert out["src1"]["max_shared_grams"] == 2
    assert out["src1"]["contaminated_share"] == pytest.approx(0.5)
    assert out["src2"]["n_contaminated"] == 1
    assert out["src2"]["max_shared_grams"] == 1


def test_boxplot_hand_computed(spark, tmp_path_factory):
    from us_flight_bigdata_dashboard_spark.operators.breadth import q_boxplot_stats

    root = str(tmp_path_factory.mktemp("boxplot"))
    # values 1..11 plus one extreme outlier 100 (n=12):
    # ranks: p25=(12+3)//4=3 -> 3.0; p50=(13)//2=6 -> 6.0; p75=(39)//4=9 -> 9.0
    # IQR=6; hi fence 9+9=18 -> only 100 is out; lo fence 3-9=-6 -> none
    vals = list(range(1, 12)) + [100]
    orders = [
        (i, 1, "O", float(v), dt.datetime(1995, 1, 2), "1-URGENT")
        for i, v in enumerate(vals)
    ]
    _write(
        spark, root, "orders", orders,
        "o_orderkey bigint, o_custkey bigint, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    )
    (row,) = q_boxplot_stats(spark, root).collect()
    assert row["n_orders"] == 12
    assert (row["min_cents"], row["p25_cents"], row["p50_cents"],
            row["p75_cents"], row["max_cents"]) == (100, 300, 600, 900, 10000)
    assert row["n_outliers"] == 1


# ---------------------------------------------------------------------------
# variant shredding / activity islands
# ---------------------------------------------------------------------------


def test_variant_extracts_typed_k(spark, tmp_path_factory):
    from us_flight_bigdata_dashboard_spark.operators.relational import (
        q_variant_json_shred,
    )

    root = str(tmp_path_factory.mktemp("variant"))
    rows = [
        (0, dt.datetime(2024, 1, 1), 1, "view", 1.0, '{"k": 5}'),
        (1, dt.datetime(2024, 1, 1), 1, "view", 1.0, '{"k": 7}'),
        (2, dt.datetime(2024, 1, 1), 1, "view", 1.0, '{"other": 1}'),  # no k
    ]
    _write(
        spark, root, "events", rows,
        "event_id bigint, ts timestamp, user_id bigint, event_type string, "
        "value double, props string",
    )
    (row,) = q_variant_json_shred(spark, root).collect()
    assert (row["n_events"], row["n_with_k"], row["sum_k"], row["min_k"],
            row["max_k"]) == (3, 2, 12, 5, 7)


def test_activity_islands_hand_computed(spark, tmp_path_factory):
    from us_flight_bigdata_dashboard_spark.operators.events import (
        q_events_activity_islands,
    )

    root = str(tmp_path_factory.mktemp("islands"))
    # user 1 active days 1,2,3, 5 → islands len 3 and 1 (longest 3)
    # user 2 active days 1, 3 → two islands len 1 (longest 1)
    active = {1: [1, 2, 3, 5], 2: [1, 3]}
    rows, eid = [], 0
    for uid, ds in active.items():
        for d in ds:
            rows.append(
                (eid, dt.datetime(2024, 1, d, 8, 0, 0), uid, "view", 1.0, "{}")
            )
            eid += 1
    _write(
        spark, root, "events", rows,
        "event_id bigint, ts timestamp, user_id bigint, event_type string, "
        "value double, props string",
    )
    out = {r["island_len"]: r for r in q_events_activity_islands(spark, root).collect()}
    assert out[1]["n_islands"] == 3          # one from user 1, two from user 2
    assert out[1]["n_users_longest"] == 1    # only user 2's longest is 1
    assert out[3]["n_islands"] == 1
    assert out[3]["n_users_longest"] == 1


def test_weighted_median_respects_weights(spark, tmp_path_factory):
    from us_flight_bigdata_dashboard_spark.operators.breadth import (
        q_weighted_median_price,
    )

    root = str(tmp_path_factory.mktemp("wmedian"))
    # three lines, unit prices 1.00/2.00/3.00 with weights 1/1/8:
    # row median = 2.00 but 8 of 10 units cost 3.00 → weighted median 300c
    rows = [
        (1, 1, 1, 1, 1.0, 1.0, 0.0, 0.0, "N", "O", dt.datetime(1995, 1, 2)),
        (2, 1, 1, 1, 1.0, 2.0, 0.0, 0.0, "N", "O", dt.datetime(1995, 1, 2)),
        (3, 1, 1, 1, 8.0, 24.0, 0.0, 0.0, "N", "O", dt.datetime(1995, 1, 2)),
    ]
    _write(spark, root, "lineitem", rows, _LI_SCHEMA)
    (row,) = q_weighted_median_price(spark, root).collect()
    assert row["total_qty"] == 10
    assert row["weighted_median_cents"] == 300


def test_standardized_rate_removes_mix_confounding(spark, tmp_path_factory):
    from us_flight_bigdata_dashboard_spark.operators.inference import (
        q_standardized_rate_mix,
    )

    root = str(tmp_path_factory.mktemp("stdrate"))
    # Simpson setup: both nations have IDENTICAL per-segment urgent rates
    # (BUILDING 50%, MACHINERY 10%) but nation 0 skews BUILDING-heavy, so
    # its crude rate is higher; standardization must equalize them.
    custs, orders, ck, ok = [], [], 0, 0
    def add(nation, seg, n_cust, urgent_of_two):
        nonlocal ck, ok
        for _ in range(n_cust):
            custs.append((ck, f"Customer#{ck:09d}", nation, 100.0, seg))
            for j in range(2):
                prio = "1-URGENT" if j < urgent_of_two else "5-LOW"
                orders.append((ok, ck, "O", 100.0, dt.datetime(1995, 1, 2), prio))
                ok += 1
            ck += 1
    add(0, "BUILDING", 8, 1)   # rate 0.5
    add(0, "MACHINERY", 2, 0)  # rate 0.0  (10% overall approx -> use 0 for exactness)
    add(1, "BUILDING", 2, 1)
    add(1, "MACHINERY", 8, 0)
    _write(
        spark, root, "customer", custs,
        "c_custkey bigint, c_name string, c_nationkey int, c_acctbal double, "
        "c_mktsegment string",
    )
    _write(
        spark, root, "orders", orders,
        "o_orderkey bigint, o_custkey bigint, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    )
    out = {r["c_nationkey"]: r for r in q_standardized_rate_mix(spark, root).collect()}
    assert out[0]["crude_rate"] > out[1]["crude_rate"]          # mix artifact
    assert out[0]["standardized_rate"] == pytest.approx(out[1]["standardized_rate"])
    # w_BUILDING = 0.5, w_MACHINERY = 0.5; rates 0.5/0.0 -> standardized 0.25
    assert out[0]["standardized_rate"] == pytest.approx(0.25)


# ---------------------------------------------------------------------------
# kruskal_wallis: brute-force midrank reference
# ---------------------------------------------------------------------------


def _brute_kruskal(pairs):
    """pairs: list of (priority, value) → (H, tie_correction)."""
    from collections import Counter, defaultdict

    cnt = Counter(v for _, v in pairs)
    ranks, t = {}, 0
    for v in sorted(cnt):
        c = cnt[v]
        ranks[v] = t + (c + 1) / 2
        t += c
    n_tot = len(pairs)
    rsum, n = defaultdict(float), Counter()
    for g, v in pairs:
        rsum[g] += ranks[v]
        n[g] += 1
    h = 12.0 / (n_tot * (n_tot + 1)) * sum(
        rsum[g] ** 2 / n[g] for g in sorted(rsum)
    ) - 3.0 * (n_tot + 1)
    corr = 1.0 - sum(c**3 - c for c in cnt.values()) / (n_tot**3 - n_tot)
    return h, corr


_PRIOS = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]


def _kw_orders(pairs):
    return [(i, float(v), p) for i, (p, v) in enumerate(pairs)]


_KW_SCHEMA = "o_orderkey bigint, o_totalprice double, o_orderpriority string"


def test_kruskal_wallis_planted_shift(spark, tmp_path_factory):
    import random

    from us_flight_bigdata_dashboard_spark.operators.inference import (
        q_kruskal_wallis,
    )

    rng = random.Random(11)
    # planted: URGENT values shifted +50; ties forced via integer values
    pairs = []
    for p in _PRIOS:
        shift = 50 if p == "1-URGENT" else 0
        pairs += [(p, rng.randint(1, 40) + shift) for _ in range(30)]
    root = str(tmp_path_factory.mktemp("kw"))
    _write(spark, root, "orders", _kw_orders(pairs), _KW_SCHEMA)
    (row,) = q_kruskal_wallis(spark, root).collect()
    h, corr = _brute_kruskal(pairs)
    assert row["n_rows"] == len(pairs)
    assert row["h_stat"] == pytest.approx(h, rel=1e-12)
    assert row["tie_correction"] == pytest.approx(corr, rel=1e-12)
    assert row["h_adj"] == pytest.approx(h / corr, rel=1e-12)
    assert row["h_adj"] > 9.488  # chi2(4) at 5% — planted shift detected


def test_kruskal_wallis_null_case(spark, tmp_path_factory):
    import random

    from us_flight_bigdata_dashboard_spark.operators.inference import (
        q_kruskal_wallis,
    )

    rng = random.Random(13)
    pairs = [(p, rng.randint(1, 1000)) for p in _PRIOS for _ in range(40)]
    root = str(tmp_path_factory.mktemp("kwnull"))
    _write(spark, root, "orders", _kw_orders(pairs), _KW_SCHEMA)
    (row,) = q_kruskal_wallis(spark, root).collect()
    h, corr = _brute_kruskal(pairs)
    assert row["h_adj"] == pytest.approx(h / corr, rel=1e-12)
    assert row["h_adj"] < 9.488  # same-distribution groups stay under critical


# ---------------------------------------------------------------------------
# model_gains_lift: perfectly separating score
# ---------------------------------------------------------------------------


def test_gains_lift_perfect_separator(spark, tmp_path_factory):
    from us_flight_bigdata_dashboard_spark.operators.statistics import (
        q_model_gains_lift,
    )

    # 200 orders; the 40 highest-scored are exactly the urgent ones
    rows = []
    for i in range(200):
        urgent = i < 40
        score = 10000.0 - i  # descending by i → first 40 = top 2 deciles
        rows.append((i, score, "1-URGENT" if urgent else "5-LOW"))
    root = str(tmp_path_factory.mktemp("gains"))
    _write(spark, root, "orders", rows, _KW_SCHEMA)
    out = {r["decile"]: r for r in q_model_gains_lift(spark, root).collect()}
    assert sorted(out) == list(range(1, 11))
    assert all(out[d]["n_rows"] == 20 for d in out)
    # top two deciles capture all positives at maximal lift (base rate 0.2)
    assert out[1]["lift"] == pytest.approx(5.0)
    assert out[2]["lift"] == pytest.approx(5.0)
    assert out[2]["cum_capture"] == pytest.approx(1.0)
    assert out[10]["cum_capture"] == pytest.approx(1.0)
    assert out[10]["cum_lift"] == pytest.approx(1.0)
    assert all(out[d]["n_pos"] == 0 for d in range(3, 11))


def test_gains_lift_matches_plain_ntile_semantics(spark, tmp_path_factory):
    """Bucketed-rank decile == plain (rank-1)*10 DIV n decile on ties."""
    import random

    from us_flight_bigdata_dashboard_spark.operators.statistics import (
        q_model_gains_lift,
    )

    rng = random.Random(3)
    rows = [
        (i, float(rng.randint(1, 30)), rng.choice(["1-URGENT", "3-MEDIUM"]))
        for i in range(173)  # deliberately not divisible by 10, heavy ties
    ]
    root = str(tmp_path_factory.mktemp("gains2"))
    _write(spark, root, "orders", rows, _KW_SCHEMA)
    out = q_model_gains_lift(spark, root).collect()
    # brute force via the same closed form on a python sort
    srt = sorted(rows, key=lambda r: (-r[1], -r[0]))
    n = len(srt)
    import collections

    exp = collections.Counter()
    exp_pos = collections.Counter()
    for dr0, r in enumerate(srt):
        d = dr0 * 10 // n + 1
        exp[d] += 1
        exp_pos[d] += 1 if r[2] == "1-URGENT" else 0
    for row in out:
        assert row["n_rows"] == exp[row["decile"]]
        assert row["n_pos"] == exp_pos[row["decile"]]


# ---------------------------------------------------------------------------
# mantel_haenszel_or: planted confounding (within-stratum OR = 1)
# ---------------------------------------------------------------------------


def test_mantel_haenszel_removes_planted_confounding(spark, tmp_path_factory):
    from us_flight_bigdata_dashboard_spark.operators.inference import (
        q_mantel_haenszel_or,
    )

    # per-segment 2x2 cells (a=E&D, b=E&~D, c=~E&D, d=~E&~D), all OR = 1,
    # but exposure prevalence and base rates differ => crude OR != 1
    cells = {
        "AUTOMOBILE": (40, 40, 10, 10),
        "BUILDING": (5, 45, 10, 90),
        "FURNITURE": (2, 2, 2, 2),
        "HOUSEHOLD": (3, 3, 3, 3),
        "MACHINERY": (4, 4, 4, 4),
    }
    orders, cust = [], []
    k = 0
    for seg, (a, b, c, d) in cells.items():
        for cnt, exposed, urgent in ((a, 1, 1), (b, 1, 0), (c, 0, 1), (d, 0, 0)):
            for _ in range(cnt):
                cust.append((k, seg, 9000.0 if exposed else 0.0))
                orders.append((k, k, "1-URGENT" if urgent else "5-LOW"))
                k += 1
    root = str(tmp_path_factory.mktemp("mh"))
    _write(spark, root, "orders", orders,
           "o_orderkey bigint, o_custkey bigint, o_orderpriority string")
    _write(spark, root, "customer", cust,
           "c_custkey bigint, c_mktsegment string, c_acctbal double")
    (row,) = q_mantel_haenszel_or(spark, root).collect()
    assert row["n_rows"] == k
    assert row["mh_or"] == pytest.approx(1.0, abs=1e-12)
    # crude OR: ta=54 tb=94 tc=29 td=109
    assert row["crude_or"] == pytest.approx((54 * 109) / (94 * 29), rel=1e-12)
    assert abs(row["crude_or"] - 1.0) > 0.5  # the confounding MH removes


# ---------------------------------------------------------------------------
# tcloseness_audit: brute-force EMD on planted skew
# ---------------------------------------------------------------------------


def _brute_emd(class_counts, global_counts):
    m = len(class_counts)
    n, g = sum(class_counts), sum(global_counts)
    acc, cp, cg = 0.0, 0.0, 0.0
    for j in range(m - 1):
        cp += class_counts[j] / n
        cg += global_counts[j] / g
        acc += abs(cp - cg)
    return acc / (m - 1)


def test_tcloseness_planted_skew(spark, tmp_path_factory):
    from us_flight_bigdata_dashboard_spark.operators.audit import (
        TCLOSE_BAL_BIN,
        q_tcloseness_audit,
    )

    # brackets via floor(bal/2000) in {-1,0,1,2,3,4}; representative values
    rep = {b: b * TCLOSE_BAL_BIN + 100.0 for b in (-1, 0, 1, 2, 3, 4)}
    rows = []
    k = 0
    # class (AUTOMOBILE, 1): all mass in top bracket (worst-case skew)
    skew = [0, 0, 0, 0, 0, 60]
    # class (AUTOMOBILE, 2): uniform across all six
    uni = [10, 10, 10, 10, 10, 10]
    # class (BUILDING, 3): mild skew
    mild = [5, 10, 15, 15, 10, 5]
    bg = [40, 40, 40, 40, 40, 40]
    classes = {
        ("AUTOMOBILE", 1): skew,
        ("AUTOMOBILE", 2): uni,
        ("BUILDING", 3): mild,
        ("MACHINERY", 9): bg,
    }
    for (seg, nat), counts in classes.items():
        for j, b in enumerate((-1, 0, 1, 2, 3, 4)):
            for _ in range(counts[j]):
                rows.append((k, seg, nat, rep[b]))
                k += 1
    root = str(tmp_path_factory.mktemp("tclose"))
    _write(spark, root, "customer", rows,
           "c_custkey bigint, c_mktsegment string, c_nationkey bigint, c_acctbal double")
    out = {r["c_mktsegment"]: r for r in q_tcloseness_audit(spark, root).collect()}
    g = [a + b + c + d for a, b, c, d in zip(skew, uni, mild, bg)]
    t_skew = _brute_emd(skew, g)
    t_uni = _brute_emd(uni, g)
    t_mild = _brute_emd(mild, g)
    assert out["AUTOMOBILE"]["n_classes"] == 2
    assert out["AUTOMOBILE"]["max_t"] == pytest.approx(max(t_skew, t_uni), rel=1e-12)
    assert out["BUILDING"]["max_t"] == pytest.approx(t_mild, rel=1e-12)
    assert t_skew > 0.15 and t_uni < 0.15  # worst skew trips the gate
    auto_above = sum(1 for t in (t_skew, t_uni) if t > 0.15)
    auto_rows = (60 if t_skew > 0.15 else 0) + (60 if t_uni > 0.15 else 0)
    assert out["AUTOMOBILE"]["n_above_t"] == auto_above
    assert out["AUTOMOBILE"]["rows_above_t"] == auto_rows
    assert out["BUILDING"]["n_above_t"] == (1 if t_mild > 0.15 else 0)


# ---------------------------------------------------------------------------
# sketch_kmv_distinct: exact fallback + brute-force k-th-minimum estimate
# ---------------------------------------------------------------------------


def test_kmv_exact_fallback_and_estimate(spark, tmp_path_factory):
    import hashlib

    from us_flight_bigdata_dashboard_spark.operators.sketches import (
        KMV_K,
        KMV_NUM,
        q_sketch_kmv_distinct,
    )

    rows = []
    # group 1-URGENT: 100 distinct customers (< k) → sketch IS the set
    for i in range(100):
        rows.append((i, i, "1-URGENT"))
    # group 5-LOW: 2000 distinct customers (> k) → real estimate
    for i in range(2000):
        rows.append((10_000 + i, 100_000 + i, "5-LOW"))
    root = str(tmp_path_factory.mktemp("kmv"))
    _write(spark, root, "orders", rows,
           "o_orderkey bigint, o_custkey bigint, o_orderpriority string")
    out = {r["o_orderpriority"]: r for r in q_sketch_kmv_distinct(spark, root).collect()}
    u = out["1-URGENT"]
    assert u["n_exact"] == 100 and u["n_cand"] == 100
    assert u["kmv_est"] == 100.0 and u["rel_err_pct"] == 0.0
    lo = out["5-LOW"]
    hs = sorted(
        int(hashlib.md5(str(100_000 + i).encode()).hexdigest()[:12], 16)
        for i in range(2000)
    )
    assert lo["n_exact"] == 2000 and lo["n_cand"] == KMV_K
    assert lo["kmv_est"] == KMV_NUM / float(hs[KMV_K - 1])
    assert abs(lo["kmv_est"] - 2000) / 2000 < 0.25  # ~4 sigma at k=256


# ---------------------------------------------------------------------------
# cochran_armitage: planted dose-response trend
# ---------------------------------------------------------------------------


def _brute_cochran(pairs):
    """pairs: (w, returned01) → (t, var, z2)."""
    n = len(pairs)
    r = sum(p[1] for p in pairs)
    swn = sum(p[0] for p in pairs)
    swr = sum(p[0] * p[1] for p in pairs)
    sw2n = sum(p[0] * p[0] for p in pairs)
    pbar = r / n
    t = swr - swn * pbar
    var = pbar * (1 - pbar) * (sw2n - swn * swn / n)
    return t, var, t * t / var


_CA_SCHEMA = "l_orderkey bigint, l_quantity double, l_returnflag string"


def test_cochran_armitage_planted_trend(spark, tmp_path_factory):
    import random

    from us_flight_bigdata_dashboard_spark.operators.inference import (
        q_cochran_armitage,
    )

    rng = random.Random(5)
    # returned-probability rises with quantity: p = q/60
    pairs = []
    for i in range(1200):
        q = rng.randint(1, 50)
        pairs.append((q, 1 if rng.random() < q / 60 else 0))
    rows = [(i, float(w), "R" if r else "N") for i, (w, r) in enumerate(pairs)]
    root = str(tmp_path_factory.mktemp("ca"))
    _write(spark, root, "lineitem", rows, _CA_SCHEMA)
    (row,) = q_cochran_armitage(spark, root).collect()
    t, var, z2 = _brute_cochran(pairs)
    assert row["n"] == 1200
    assert row["t_stat"] == pytest.approx(t, rel=1e-12)
    assert row["var_t"] == pytest.approx(var, rel=1e-12)
    assert row["z_squared"] == pytest.approx(z2, rel=1e-12)
    assert row["trend_flag"] == 1


def test_cochran_armitage_null_flag(spark, tmp_path_factory):
    import random

    from us_flight_bigdata_dashboard_spark.operators.inference import (
        q_cochran_armitage,
    )

    rng = random.Random(17)
    pairs = [(rng.randint(1, 50), 1 if rng.random() < 0.3 else 0) for _ in range(1200)]
    rows = [(i, float(w), "R" if r else "N") for i, (w, r) in enumerate(pairs)]
    root = str(tmp_path_factory.mktemp("canull"))
    _write(spark, root, "lineitem", rows, _CA_SCHEMA)
    (row,) = q_cochran_armitage(spark, root).collect()
    _, _, z2 = _brute_cochran(pairs)
    assert row["z_squared"] == pytest.approx(z2, rel=1e-12)
    assert row["trend_flag"] == (1 if z2 > 3.8415 else 0)
    assert z2 < 3.8415  # no planted trend


# ---------------------------------------------------------------------------
# durbin_watson: planted residual autocorrelation
# ---------------------------------------------------------------------------


def _brute_dw(xy):
    n = len(xy)
    sx = sum(x for x, _ in xy); sy = sum(y for _, y in xy)
    sxy = sum(x * y for x, y in xy); sxx = sum(x * x for x, y in xy)
    b = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    a = (sy - b * sx) / n
    es = [y - (a + b * x) for x, y in sorted(xy)]
    num = sum((es[i] - es[i - 1]) ** 2 for i in range(1, n))
    den = sum(e * e for e in es)
    return num / den


def _dw_tables(spark, root, monthly_dollars):
    """monthly_dollars: {month_index: dollars} — one region, one customer."""
    orders = []
    for i, (xm, dollars) in enumerate(sorted(monthly_dollars.items())):
        y, m = divmod(xm, 12)
        orders.append((i, 1, float(dollars), dt.datetime(y, m + 1, 15)))
    _write(spark, root, "orders", orders,
           "o_orderkey bigint, o_custkey bigint, o_totalprice double, o_orderdate timestamp")
    _write(spark, root, "customer", [(1, 0)], "c_custkey bigint, c_nationkey bigint")
    _write(spark, root, "nation", [(0, 0)], "n_nationkey bigint, n_regionkey bigint")
    _write(spark, root, "region", [(0, "ASIA")], "r_regionkey bigint, r_name string")


def test_durbin_watson_alternating_residuals(spark, tmp_path_factory):
    from us_flight_bigdata_dashboard_spark.operators.statistics import (
        q_durbin_watson,
    )

    # line + alternating +/-c noise => negative serial corr, DW -> 4
    base = 24000
    xy = {base + i: 2_000_000.0 + 10_000.0 * i + (80_000.0 if i % 2 else -80_000.0)
          for i in range(36)}
    root = str(tmp_path_factory.mktemp("dw4"))
    _dw_tables(spark, root, xy)
    (row,) = q_durbin_watson(spark, root).collect()
    exp = _brute_dw([(x, round(v * 100)) for x, v in xy.items()])
    assert row["n_months"] == 36
    assert row["dw_stat"] == pytest.approx(exp, rel=1e-3)  # dsum quantization
    assert row["dw_stat"] > 3.0
    assert row["rho_hat"] == pytest.approx(1 - row["dw_stat"] / 2, rel=1e-12)


def test_durbin_watson_smooth_curvature(spark, tmp_path_factory):
    from us_flight_bigdata_dashboard_spark.operators.statistics import (
        q_durbin_watson,
    )

    # quadratic trend fit by a line => smooth residual arcs, DW -> 0
    base = 24000
    xy = {base + i: 2_000_000.0 + 3_000.0 * (i - 18) ** 2 for i in range(36)}
    root = str(tmp_path_factory.mktemp("dw0"))
    _dw_tables(spark, root, xy)
    (row,) = q_durbin_watson(spark, root).collect()
    exp = _brute_dw([(x, round(v * 100)) for x, v in xy.items()])
    assert row["dw_stat"] == pytest.approx(exp, rel=1e-3)
    assert row["dw_stat"] < 0.5


# ---------------------------------------------------------------------------
# capture_recapture: planted partial overlap, hand-checked Chapman
# ---------------------------------------------------------------------------


def test_capture_recapture_planted_overlap(spark, tmp_path_factory):
    from us_flight_bigdata_dashboard_spark.operators.dedup import (
        q_capture_recapture,
    )

    # single-token docs => each doc contributes its text as one shingle.
    # occasion src0 (even) sees words 0..59; src1 (odd) sees 40..99
    rows = []
    k = 0
    for i in range(60):
        rows.append((k, f"w{i:03d}", "en", "src0", 4)); k += 1
    for i in range(40, 100):
        rows.append((k, f"w{i:03d}", "en", "src1", 4)); k += 1
    root = str(tmp_path_factory.mktemp("cr"))
    _write(spark, root, "documents", rows,
           "doc_id bigint, text string, lang string, source string, n_chars bigint")
    (row,) = q_capture_recapture(spark, root).collect()
    n1, n2, m = 60, 60, 20
    assert (row["n1"], row["n2"], row["m"]) == (n1, n2, m)
    assert row["n_union_exact"] == 100
    est = (n1 + 1) * (n2 + 1) / (m + 1) - 1
    assert row["chapman_est"] == pytest.approx(est, rel=1e-12)
    var = (n1 + 1) * (n2 + 1) * (n1 - m) * (n2 - m) / ((m + 1) ** 2 * (m + 2))
    assert row["se_est"] == pytest.approx(var**0.5, rel=1e-12)
    # the estimator extrapolates ABOVE the observed union toward truth
    assert row["chapman_est"] > 100


# ---------------------------------------------------------------------------
# scan_xml_roundtrip: markup-escaping fidelity on crafted values
# ---------------------------------------------------------------------------


def test_xml_roundtrip_escapes_markup(spark, tmp_path_factory):
    """The digest gate proves fidelity on real data; this pins the nasty
    cases explicitly: &, <, >, quotes and whitespace in a string column
    survive the XML write→read."""
    import os

    root = str(tmp_path_factory.mktemp("xmlesc"))
    rows = [(1, 1, dt.datetime(1995, 3, 1), 101.25, "A&B <tag> \"q\" 'x'"),
            (2, 2, dt.datetime(1996, 7, 4), 0.01, "  pad  ")]
    schema = ("l_orderkey bigint, l_linenumber int, l_shipdate timestamp, "
              "l_extendedprice double, l_returnflag string")
    df = spark.createDataFrame(rows, schema)
    out = os.path.join(root, "xml")
    (df.write.mode("overwrite").format("xml")
       .option("rootTag", "lineitems").option("rowTag", "li").save(out))
    back = (spark.read.format("xml").option("rowTag", "li").schema(schema)
            .load(out).orderBy("l_orderkey").collect())
    assert back[0]["l_returnflag"] == "A&B <tag> \"q\" 'x'"
    assert back[0]["l_extendedprice"] == 101.25
    assert back[0]["l_shipdate"] == dt.datetime(1995, 3, 1)
    assert back[1]["l_orderkey"] == 2


# ---------------------------------------------------------------------------
# sprt_sequential: planted effect stops early at the brute-forced day
# ---------------------------------------------------------------------------


def _sprt_brute(day_counts):
    """day_counts: [(day, successes, failures)] sorted → (first_cross_day, verdict)."""
    from us_flight_bigdata_dashboard_spark.operators.inference import (
        SPRT_A,
        SPRT_B,
        SPRT_L0,
        SPRT_L1,
    )

    cs = cf = 0
    for day, s, f in day_counts:
        cs += s; cf += f
        llr = cs * SPRT_L1 + cf * SPRT_L0
        if llr >= SPRT_A:
            return day, "accept_h1"
        if llr <= SPRT_B:
            return day, "accept_h0"
    return None, "continue"


def _sprt_events(arm_days):
    """arm_days: {arm: [(day, s, f)]} → events rows."""
    rows = []
    eid = 0
    for arm, seq in arm_days.items():
        uid = arm  # user_id % 2 == arm
        for day, s, f in seq:
            for _ in range(s):
                rows.append((eid, dt.datetime(2024, 1, day, 12), uid, "purchase", 1.0, "{}")); eid += 1
            for _ in range(f):
                rows.append((eid, dt.datetime(2024, 1, day, 13), uid, "view", 1.0, "{}")); eid += 1
    return rows


_EV_SCHEMA = ("event_id bigint, ts timestamp, user_id bigint, event_type string, "
              "value double, props string")


def test_sprt_planted_lift_and_null(spark, tmp_path_factory):
    from us_flight_bigdata_dashboard_spark.operators.inference import (
        q_sprt_sequential,
    )

    # arm 0: 40% purchase rate (strong lift) → accept_h1 early
    # arm 1: 5% purchase rate (below p0) → accept_h0
    arm0 = [(d, 20, 30) for d in range(1, 21)]
    arm1 = [(d, 2, 38) for d in range(1, 21)]
    rows = _sprt_events({0: arm0, 1: arm1})
    root = str(tmp_path_factory.mktemp("sprt"))
    _write(spark, root, "events", rows, _EV_SCHEMA)
    out = {r["arm"]: r for r in q_sprt_sequential(spark, root).collect()}
    d0, v0 = _sprt_brute(arm0)
    d1, v1 = _sprt_brute(arm1)
    assert v0 == "accept_h1" and v1 == "accept_h0"  # the plant works
    assert out[0]["verdict"] == v0
    assert out[0]["decision_day"] == dt.date(2024, 1, d0)
    assert out[1]["verdict"] == v1
    assert out[1]["decision_day"] == dt.date(2024, 1, d1)
    assert out[0]["n_success"] == 400 and out[0]["n_failure"] == 600


# ---------------------------------------------------------------------------
# cohens_kappa: hand-computed 2x2 agreement
# ---------------------------------------------------------------------------


def test_cohens_kappa_hand_computed(spark, tmp_path_factory):
    from us_flight_bigdata_dashboard_spark.operators.inference import (
        KAPPA_CHARS,
        KAPPA_TOKENS,
        q_cohens_kappa,
    )

    # construct exact 2x2 cells: yy=40, yn=10, ny=5, nn=45
    long_txt = " ".join(f"t{i}" for i in range(KAPPA_TOKENS + 5))   # B yes
    short_txt = " ".join(f"t{i}" for i in range(5))                 # B no
    rows, k = [], 0
    for cnt, chars, txt in (
        (40, KAPPA_CHARS + 10, long_txt),   # A yes, B yes
        (10, KAPPA_CHARS + 10, short_txt),  # A yes, B no
        (5, KAPPA_CHARS - 10, long_txt),    # A no,  B yes
        (45, KAPPA_CHARS - 10, short_txt),  # A no,  B no
    ):
        for _ in range(cnt):
            rows.append((k, txt, "en", "src0", chars)); k += 1
    root = str(tmp_path_factory.mktemp("kappa"))
    _write(spark, root, "documents", rows,
           "doc_id bigint, text string, lang string, source string, n_chars bigint")
    (row,) = q_cohens_kappa(spark, root).collect()
    assert (row["yy"], row["yn"], row["ny"], row["nn"]) == (40, 10, 5, 45)
    po = 85 / 100
    pe = (50 * 45 + 50 * 55) / 100**2
    assert row["p_observed"] == pytest.approx(po, rel=1e-12)
    assert row["p_expected"] == pytest.approx(pe, rel=1e-12)
    assert row["kappa"] == pytest.approx((po - pe) / (1 - pe), rel=1e-12)


# ---------------------------------------------------------------------------
# runs_test: planted trend (few runs) vs alternation (many runs)
# ---------------------------------------------------------------------------


def _runs_brute(series):
    vals = sorted(v for _, v in series)
    med = vals[(len(vals) + 1) // 2 - 1]
    signs = [(d, 1 if v > med else 0) for d, v in sorted(series) if v != med]
    n1 = sum(s for _, s in signs)
    n2 = len(signs) - n1
    r = sum(1 for i, (_, s) in enumerate(signs) if i == 0 or s != signs[i - 1][1])
    mu = 2 * n1 * n2 / (n1 + n2) + 1
    var = 2 * n1 * n2 * (2 * n1 * n2 - n1 - n2) / ((n1 + n2) ** 2 * (n1 + n2 - 1))
    return n1, n2, r, mu, (r - mu) / var**0.5


def _runs_orders(series):
    rows = []
    k = 0
    for day, dollars in series:
        rows.append((k, float(dollars), dt.datetime(1995, 1, 1) + dt.timedelta(days=day)))
        k += 1
    return rows


_RUNS_SCHEMA = "o_orderkey bigint, o_totalprice double, o_orderdate timestamp"


def test_runs_test_trend_vs_alternation(spark, tmp_path_factory):
    from us_flight_bigdata_dashboard_spark.operators.statistics import q_runs_test

    # trending series: first 30 days low, last 30 high → 2 runs, z << 0
    trend = [(d, 100 + d) for d in range(60)]
    root = str(tmp_path_factory.mktemp("runs1"))
    _write(spark, root, "orders", _runs_orders(trend), _RUNS_SCHEMA)
    (row,) = q_runs_test(spark, root).collect()
    n1, n2, r, mu, z = _runs_brute(trend)
    assert (row["n1"], row["n2"], row["r_runs"]) == (n1, n2, r)
    assert row["z_stat"] == pytest.approx(z, rel=1e-12)
    assert row["r_runs"] == 2 and row["z_stat"] < -7

    # alternating series → maximal runs, z >> 0
    alt = [(d, 100 + (50 if d % 2 else -50) + d * 0.001) for d in range(60)]
    root2 = str(tmp_path_factory.mktemp("runs2"))
    _write(spark, root2, "orders", _runs_orders(alt), _RUNS_SCHEMA)
    (row2,) = q_runs_test(spark, root2).collect()
    n1b, n2b, rb, mub, zb = _runs_brute([(d, round(v * 100)) for d, v in alt])
    assert (row2["n1"], row2["n2"], row2["r_runs"]) == (n1b, n2b, rb)
    assert row2["z_stat"] == pytest.approx(zb, rel=1e-12)
    assert row2["z_stat"] > 6  # near-maximal alternation


# ---------------------------------------------------------------------------
# jackknife_ratio: brute-forced delete-one replicates
# ---------------------------------------------------------------------------


def test_jackknife_ratio_brute_force(spark, tmp_path_factory):
    import random

    from us_flight_bigdata_dashboard_spark.operators.statistics import (
        q_jackknife_ratio,
    )

    rng = random.Random(23)
    orders, cust = [], []
    k = 0
    cells = {}
    for nat in range(8):
        cust.append((nat, nat))
        y = x = 0
        for _ in range(rng.randint(20, 40)):
            price = rng.randint(1000, 9999)  # whole cents via .25 steps
            urgent = rng.random() < 0.2 + 0.03 * nat  # heterogeneous rates
            orders.append((k, nat, float(price) / 100, "1-URGENT" if urgent else "5-LOW"))
            x += price
            y += price if urgent else 0
            k += 1
        cells[nat] = (y, x)
    root = str(tmp_path_factory.mktemp("jack"))
    _write(spark, root, "orders", orders,
           "o_orderkey bigint, o_custkey bigint, o_totalprice double, o_orderpriority string")
    _write(spark, root, "customer", cust, "c_custkey bigint, c_nationkey bigint")
    (row,) = q_jackknife_ratio(spark, root).collect()
    ty = sum(y for y, _ in cells.values()); tx = sum(x for _, x in cells.values())
    ris = [(ty - y) / (tx - x) for y, x in cells.values()]
    n = len(ris)
    rbar = sum(ris) / n
    se = ((n - 1) / n * sum((r - rbar) ** 2 for r in ris)) ** 0.5
    assert row["n_groups"] == n
    assert row["ratio_full"] == pytest.approx(ty / tx, rel=1e-12)
    assert row["ratio_loo_mean"] == pytest.approx(rbar, rel=1e-9)
    assert row["jack_bias"] == pytest.approx((n - 1) * (rbar - ty / tx), rel=1e-6, abs=1e-12)
    assert row["jack_se"] == pytest.approx(se, rel=1e-6)
