"""Determinism contract: results are BIT-IDENTICAL under different shuffle
partitionings. This is the property the exact decimal / fixed-point sum
machinery exists to provide — a naive double SUM would fail this test on
the float-aggregating queries."""

from __future__ import annotations

import pytest

from us_flight_bigdata_dashboard_spark.registry import queries

SF_DIR = "/root/testdata/sf0.01"

# float-aggregating queries where partition merge order would show up first
PROBES = [
    "regression_ols",
    "corr_pairs",
    "autocorr_lag",
    "graph_pagerank",
    "sparse_allpairs_sim",
    "global_kpis",
    "events_ohlc",
    "kmeans_clusters",
    # sketch candidates are partition-order-dependent; the exact verify
    # must erase that
    "heavy_hitters",
    # hash-uniform acceptance must be partition-independent by construction
    "importance_sample",
    # double scores built from pinned-order exactly-rounded ops
    "text_bm25_topk",
    "basket_rules",
    # round-3: sequential double fold — order pinned by sort_array, so the
    # partitioning that feeds collect_list must not leak into the result
    "events_ewma",
    # round-3: iterative top-1 selection each round must be total-ordered
    "bpe_learn_merges",
    # round-3: two join-agg linear-algebra sweeps of decimal-exact dots —
    # any partition-order leak would perturb the normalized component
    "embedding_pca_power",
]


@pytest.mark.parametrize("name", PROBES)
def test_bit_identical_across_partitioning(spark, name):
    fn = queries()[name]
    orig = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "32")
        a = [tuple(r) for r in fn(spark, SF_DIR).collect()]
        spark.conf.set("spark.sql.shuffle.partitions", "7")
        b = [tuple(r) for r in fn(spark, SF_DIR).collect()]
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", orig)
    assert sorted(map(repr, a)) == sorted(map(repr, b))
