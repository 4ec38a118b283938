"""End-to-end flight pipeline orchestration (E1→E2→E3 in one lazy graph).

``run_pipeline`` wires raw CSVs → clean → star → wide view → both caches.
Unlike the reference's three separate processes (cleaning script, SQL
scripts, aggregation script), the whole lineage is one Catalyst plan per
output — intermediate materialization (star parquet) is optional, used when
the star is shared across many downstream jobs.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

from us_flight_bigdata_dashboard_spark.flights import seeds
from us_flight_bigdata_dashboard_spark.flights.agg import airline_monthly_performance, airport_performance
from us_flight_bigdata_dashboard_spark.flights.clean import clean_flights
from us_flight_bigdata_dashboard_spark.flights.io import read_raw_flights
from us_flight_bigdata_dashboard_spark.flights.star import build_star
from us_flight_bigdata_dashboard_spark.flights.views import register_wide_view, wide_view


@dataclass
class PipelineOutputs:
    clean: DataFrame
    star: dict[str, DataFrame]
    wide: DataFrame
    airline_monthly: DataFrame
    airport_perf: DataFrame


def run_pipeline(spark: SparkSession, raw_csv: str, has_cancelled: bool = True) -> PipelineOutputs:
    raw = read_raw_flights(spark, raw_csv, has_cancelled=has_cancelled)
    clean = clean_flights(raw)
    star = build_star(clean)
    wide = wide_view(
        star["fact_flights"],
        seeds.dim_airline_names(spark),
        star["dim_airports"],
        star["dim_calendar"],
    )
    register_wide_view(spark, wide)
    return PipelineOutputs(
        clean=clean,
        star=star,
        wide=wide,
        airline_monthly=airline_monthly_performance(wide),
        airport_perf=airport_performance(wide, seeds.dim_airport_coords(spark)),
    )
