"""Semantic invariants for the late round-2 operators — properties the
hash-vs-oracle gate can't express (it proves Spark ≡ DuckDB, not that the
shared definition is *right*). Each test pins a mathematical property of
the operator's contract."""

from __future__ import annotations

from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.01"


def test_bloom_no_false_negatives_and_sane_fp(spark):
    from us_flight_bigdata_dashboard_spark.operators.layout import q_bloom_semi_join

    row = q_bloom_semi_join(spark, SF_DIR).collect()[0]
    # a bloom filter may over-approximate but NEVER drops a true match
    assert row["n_bloom_pass"] >= row["n_true_match"]
    assert row["n_false_pos"] == row["n_bloom_pass"] - row["n_true_match"]
    # 4096 bits / 3 hashes / ~300 keys → theoretical fp ~1.2%; allow slack
    assert row["false_pos_rate"] < 0.10


def test_zorder_buckets_bound_both_dimensions(spark):
    from us_flight_bigdata_dashboard_spark.operators.layout import (
        Z_BUCKETS,
        q_zorder_cluster,
    )

    rows = q_zorder_cluster(spark, SF_DIR).collect()
    assert 1 <= len(rows) <= Z_BUCKETS
    for r in rows:
        # 16 buckets fix the top 2 bits of EACH dimension → every bucket
        # confines both x and y to a 64-wide band (the skipping guarantee
        # a single-column sort cannot give for the second column)
        assert r["max_custkey_byte"] - r["min_custkey_byte"] <= 63
        assert r["max_doy_byte"] - r["min_doy_byte"] <= 63


def test_compaction_bins_partition_each_source(spark):
    from us_flight_bigdata_dashboard_spark.operators.layout import q_compaction_plan
    from us_flight_bigdata_dashboard_spark.sources.catalog import load_table

    plan = q_compaction_plan(spark, SF_DIR).collect()
    docs = load_table(spark, SF_DIR, "documents")
    per_source = {
        r["source"]: r["n"]
        for r in docs.groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    by_source: dict[str, list] = {}
    for r in plan:
        by_source.setdefault(r["source"], []).append(r)
    assert set(by_source) == set(per_source)
    for src, rows in by_source.items():
        # bins cover every doc exactly once and are contiguous from 0
        assert sum(r["n_docs"] for r in rows) == per_source[src]
        assert sorted(r["bin_id"] for r in rows) == list(range(len(rows)))


def test_pagerank_top_nodes_beat_uniform(spark):
    from us_flight_bigdata_dashboard_spark.operators.graph import q_graph_pagerank

    rows = q_graph_pagerank(spark, SF_DIR).collect()
    assert len(rows) == 20
    # suppliers are ~100× rarer than customers in the bipartite graph, so
    # every top-rank node must be a supplier hub …
    assert all(r["node"].startswith("s:") for r in rows)
    # … and each must hold far more than the uniform share (1/N, N ≈ 10^3)
    assert all(r["rank"] > 1e-3 for r in rows)
    # ranks are returned in strict descending order
    ranks = [r["rank"] for r in rows]
    assert ranks == sorted(ranks, reverse=True)


def test_snapshot_diff_classes_partition_both_snapshots(spark):
    from us_flight_bigdata_dashboard_spark.operators.audit import (
        _snapshots,
        q_snapshot_diff,
    )

    counts = {r["change_type"]: r["n_rows"] for r in q_snapshot_diff(spark, SF_DIR).collect()}
    assert set(counts) == {"added", "removed", "changed", "unchanged"}
    snap_a, snap_b = _snapshots(spark, SF_DIR)
    n_a, n_b = snap_a.count(), snap_b.count()
    # every key of A is removed|changed|unchanged; every key of B is
    # added|changed|unchanged — the diff is a partition of both key sets
    assert counts["removed"] + counts["changed"] + counts["unchanged"] == n_a
    assert counts["added"] + counts["changed"] + counts["unchanged"] == n_b


def test_transitions_count_totals(spark):
    from us_flight_bigdata_dashboard_spark.operators.events import q_events_transitions
    from us_flight_bigdata_dashboard_spark.sources.catalog import load_table

    rows = q_events_transitions(spark, SF_DIR).collect()
    events = load_table(spark, SF_DIR, "events")
    n_events = events.count()
    n_users = events.select("user_id").distinct().count()
    # each user contributes (events - 1) transitions
    assert sum(r["n_transitions"] for r in rows) == n_events - n_users


def test_domain_mixture_weights_normalize(spark):
    from us_flight_bigdata_dashboard_spark.operators.sampling import q_domain_mixture

    rows = q_domain_mixture(spark, SF_DIR).collect()
    total_w = sum(r["mixture_weight"] for r in rows)
    assert abs(total_w - 1.0) < 1e-9
    # α = 0.5 flattens the head: the weight ratio between the biggest and
    # smallest domain must be the sqrt of their count ratio
    big = max(rows, key=lambda r: r["n_docs"])
    small = min(rows, key=lambda r: r["n_docs"])
    ratio = big["mixture_weight"] / small["mixture_weight"]
    assert abs(ratio - (big["n_docs"] / small["n_docs"]) ** 0.5) < 1e-6


def test_winsorize_clips_both_tails(spark):
    from us_flight_bigdata_dashboard_spark.operators.advanced import q_winsorize

    for r in q_winsorize(spark, SF_DIR).collect():
        # p5/p95 clipping touches ~10% of rows (interpolation-edge slack)
        assert 0 < r["n_clipped"] <= 0.12 * r["n_orders"]
        assert r["winsor_mean"] != r["raw_mean"]


def test_schema_evolution_nulls_only_on_old_schema(spark):
    from us_flight_bigdata_dashboard_spark.operators.breadth import q_schema_evolution

    rows = {r["schema_version"]: r for r in q_schema_evolution(spark, SF_DIR).collect()}
    assert rows["v1"]["n_null_priority"] == rows["v1"]["n_rows"]  # column absent → NULL
    assert rows["v1"]["n_priorities"] == 0
    assert rows["v2"]["n_null_priority"] == 0


def test_table_stats_pk_column_exact(spark):
    from us_flight_bigdata_dashboard_spark.operators.audit import q_table_stats

    stats = {r["column_name"]: r for r in q_table_stats(spark, SF_DIR).collect()}
    pk = stats["o_orderkey"]
    assert pk["n_nulls"] == 0
    assert pk["n_distinct"] == pk["n_rows"]  # primary key: NDV == row count


def test_repetition_fractions_in_unit_interval(spark):
    from us_flight_bigdata_dashboard_spark.operators.text import q_text_repetition

    for r in q_text_repetition(spark, SF_DIR).collect():
        for c in ("uniq_token_ratio", "dup_bigram_frac", "dup_trigram_frac"):
            v = r[c]
            assert v is None or 0.0 <= v <= 1.0


def test_pq_adc_recall_against_bruteforce(spark):
    # PQ is lossy by design; the gate proves Spark ≡ DuckDB, this test
    # proves the compressed index still finds real neighbors: each query's
    # PQ top-5 must overlap its exact cosine top-10 (recall@5>=0.2 is a
    # deliberately loose floor for a 1-byte/vector code at k=4)
    from us_flight_bigdata_dashboard_spark.operators.similarity import (
        q_ann_pq,
        q_knn_bruteforce,
    )

    exact = {}
    for r in q_knn_bruteforce(spark, SF_DIR).collect():
        exact.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    hits = total = 0
    for r in q_ann_pq(spark, SF_DIR).collect():
        total += 1
        hits += r["neighbor_id"] in exact[r["query_id"]]
    assert total == 25  # 5 queries x top-5
    assert hits / total >= 0.2, f"PQ recall collapsed: {hits}/{total}"
