"""Bucketing layout test: same-bucketed fact-fact join plans with ZERO
shuffle exchanges — the co-location property that kills the dominant
shuffle at 100 TB."""

from __future__ import annotations

from pyspark.sql import functions as F

from us_flight_bigdata_dashboard_spark.plans import count_exchanges
from us_flight_bigdata_dashboard_spark.sources.bucketing import colocated_join, write_bucketed
from us_flight_bigdata_dashboard_spark.sources.catalog import load_table

SF_DIR = "/root/testdata/sf0.001"


def test_bucketed_join_has_no_shuffle(spark):
    li = write_bucketed(spark, SF_DIR, "lineitem", "l_orderkey", n_buckets=4)
    od = write_bucketed(spark, SF_DIR, "orders", "o_orderkey", n_buckets=4)
    # disable auto-broadcast so the comparison isolates bucketing, not size
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = colocated_join(spark, li, od, "l_orderkey", "o_orderkey")
        assert count_exchanges(joined) == 0

        plain = load_table(spark, SF_DIR, "lineitem").join(
            load_table(spark, SF_DIR, "orders"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        assert count_exchanges(plain) >= 2  # both sides shuffle without bucketing

        # same results either way
        assert joined.count() == plain.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "33554432")
