"""Bucketed-table layout for shuffle-free fact-fact joins (SURVEY.md §4:
the Spark replacement for the reference's MySQL join indexes,
sql/data_modeling.sql:78-80, on the co-location axis).

At 100 TB the lineitem⋈orders join is the dominant shuffle. Writing both
sides bucketed by the join key (same bucket count) lets Spark plan a
SortMergeJoin with NO Exchange on either side — each task joins bucket i
to bucket i locally. This module materializes bucketed twins of the
testdata tables and exposes the co-located join; a plan test asserts the
zero-shuffle property.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from us_flight_bigdata_dashboard_spark.sources.catalog import load_table

DEFAULT_BUCKETS = 16


def write_bucketed(
    spark: SparkSession,
    sf_dir: str,
    table: str,
    key: str,
    n_buckets: int = DEFAULT_BUCKETS,
    db: str = "bucketed",
) -> str:
    """Materialize a bucketed (+ sorted) twin of a testdata table in the
    session catalog; returns the qualified table name."""
    spark.sql(f"CREATE DATABASE IF NOT EXISTS {db}")
    name = f"{db}.{table}_b{n_buckets}"
    spark.sql(f"DROP TABLE IF EXISTS {name}")
    # a previous session's in-memory catalog may have died leaving the
    # managed location behind — saveAsTable refuses to reuse it
    import shutil
    from urllib.parse import urlparse

    warehouse = urlparse(spark.conf.get("spark.sql.warehouse.dir")).path
    shutil.rmtree(f"{warehouse}/{db}.db/{table}_b{n_buckets}", ignore_errors=True)
    (
        load_table(spark, sf_dir, table)
        .write.mode("overwrite")
        .bucketBy(n_buckets, key)
        .sortBy(key)
        .saveAsTable(name)
    )
    return name


def colocated_join(spark: SparkSession, left: str, right: str, left_key: str, right_key: str) -> DataFrame:
    """Join two same-bucketed tables on their bucket keys — planned with
    zero shuffle exchanges (asserted in tests/test_bucketing.py)."""
    lt = spark.table(left)
    rt = spark.table(right)
    return lt.join(rt, lt[left_key] == rt[right_key])
