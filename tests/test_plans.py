"""Physical-plan contract tests: the scale properties (broadcast star joins,
pushdown, pruning, minimal shuffles) are asserted, so a regression that
keeps results correct but wrecks the 100 TB plan still fails CI."""

from __future__ import annotations

from us_flight_bigdata_dashboard_spark.operators.relational import (
    q_filter_in_conj,
    q_scan_project_cast,
    q_star_join_agg,
    q_wide_view,
)
from us_flight_bigdata_dashboard_spark.plans import (
    count_broadcast_joins,
    count_sortmerge_joins,
    plan_str,
    pushed_filters,
    read_schema_columns,
)

SF_DIR = "/root/testdata/sf0.01"


def test_star_join_all_broadcast_no_smj(spark):
    df = q_star_join_agg(spark, SF_DIR)
    assert count_broadcast_joins(df) == 4
    assert count_sortmerge_joins(df) == 0


def test_wide_view_left_joins_broadcast(spark):
    df = q_wide_view(spark, SF_DIR)
    assert count_broadcast_joins(df) == 3
    assert count_sortmerge_joins(df) == 0


def test_projection_prunes_parquet_scan(spark):
    df = q_scan_project_cast(spark, SF_DIR)
    scans = read_schema_columns(df)
    assert len(scans) == 1
    # only the referenced columns are read — never the full 11-column table
    assert scans[0] <= {"l_orderkey", "l_linenumber", "l_quantity", "l_shipdate", "l_extendedprice"}


def test_in_filter_pushed_to_scan(spark):
    df = q_filter_in_conj(spark, SF_DIR)
    pf = " ".join(pushed_filters(df))
    assert "l_returnflag" in pf  # In-filter reaches the parquet reader


def test_star_join_single_agg_shuffle(spark):
    # at most 2 shuffle exchanges: the two-phase rollup (partial agg on
    # (keys, orderkey) then re-agg on keys) — no join-induced fact shuffle
    from us_flight_bigdata_dashboard_spark.plans import count_exchanges

    df = q_star_join_agg(spark, SF_DIR)
    assert count_exchanges(df) <= 2, plan_str(df)


def test_ivf_assignment_no_shuffle(spark):
    # the inverted-file build is a narrow map over broadcast centroid
    # literals: zero Exchange before the cell equi-join; the full query's
    # only shuffle is the final per-query rank window
    from us_flight_bigdata_dashboard_spark.operators.similarity import (
        ivf_assign,
        q_ann_ivf,
        train_ivf_centroids,
    )
    from us_flight_bigdata_dashboard_spark.plans import count_exchanges
    from us_flight_bigdata_dashboard_spark.sources.catalog import load_table

    cents = train_ivf_centroids(spark, SF_DIR)
    assigned = ivf_assign(load_table(spark, SF_DIR, "embeddings"), cents)
    assert count_exchanges(assigned) == 0, plan_str(assigned)
    df = q_ann_ivf(spark, SF_DIR)
    assert count_exchanges(df) <= 1, plan_str(df)
