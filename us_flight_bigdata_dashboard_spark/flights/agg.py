"""Batch aggregation engine (E2 step B): wide view → pre-aggregated caches.

Replaces src/aggregate_flight_data.py wholesale: the hand-rolled 200k-row
chunked partial/final merge (whose mean-merge is broken — SURVEY.md quirk
Q1) becomes one declarative groupBy; Spark's HashAggregate does partial→
final correctly and ``DepDelayMinutes_mean`` is the TRUE mean (documented
divergence from the reference's chunk-sum artifact; golden tests compare
that column by rank/tolerance only — FIXTURES.md §3).

The caches keep full (airline, month[, city]) dims so the serving layer can
re-aggregate additively (A10) — the two-tier design that makes dashboard
interaction millisecond-cheap at any base-data scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from us_flight_bigdata_dashboard_spark.functions.exact import davg, dsum


def airline_monthly_performance(wide: DataFrame) -> DataFrame:
    """A1/A3 + P10: per (airline_name, month) multi-aggregate + on_time_rate
    (src/aggregate_flight_data.py:26-40; column names are the golden-CSV
    output contract)."""
    agg = wide.groupBy("airline_name", "month").agg(
        F.count("DepDel15").alias("DepDel15_count"),
        dsum("DepDel15").alias("DepDel15_sum"),
        davg("DepDelayMinutes").alias("DepDelayMinutes_mean"),
        F.sum("Is_Cancelled").alias("Is_Cancelled_sum"),
        dsum("CarrierDelay").alias("CarrierDelay_sum"),
        dsum("WeatherDelay").alias("WeatherDelay_sum"),
        dsum("NASDelay").alias("NASDelay_sum"),
        dsum("LateAircraftDelay").alias("LateAircraftDelay_sum"),
    )
    return agg.withColumn(
        "on_time_rate", F.lit(1.0) - F.col("DepDel15_sum") / F.col("DepDel15_count")
    )


def airport_performance(wide: DataFrame, dim_airport_coords: DataFrame) -> DataFrame:
    """A4 + J5/P12/P13: per (airline_name, month, origin_city) counts,
    enriched with hub coordinates via broadcast inner join — the join
    replaces the reference's row-lambda dict lookup and its dropna
    (src/aggregate_flight_data.py:51-79) in one operator."""
    agg = wide.groupBy("airline_name", "month", "origin_city").agg(
        F.count(F.lit(1)).alias("total_flights"),
        dsum("DepDel15").alias("delayed_flights"),
    )
    return agg.join(F.broadcast(dim_airport_coords), "origin_city", "inner").select(
        "airline_name", "month", "origin_city", "total_flights", "delayed_flights", "lat", "lon"
    )


def write_cache(df: DataFrame, path: str) -> None:
    """S6 cache sink: single-file CSV with header (results are ≤ a few
    hundred rows by design — coalesce(1) is safe and keeps the cache a
    single artifact as in the reference)."""
    df.coalesce(1).write.mode("overwrite").option("header", True).csv(path)
