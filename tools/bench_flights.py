"""Flight-pipeline benchmark at reference scale (~1.6M rows, BASELINE.md).

Generates a synthetic BTS-shaped flights table distributively (spark.range
+ column expressions — no driver-side loop), then times the full E1→E2
pipeline: clean → star → wide view → both cache aggregations, and the
ingest write path. Prints one JSON line comparable to BASELINE.md's bars:
ingest ≥5k rows/s, full aggregation ≤20 s.

Usage: python tools/bench_flights.py [n_rows]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from us_flight_bigdata_dashboard_spark.flights import seeds
from us_flight_bigdata_dashboard_spark.flights.agg import airline_monthly_performance, airport_performance
from us_flight_bigdata_dashboard_spark.flights.clean import clean_flights
from us_flight_bigdata_dashboard_spark.flights.star import build_star
from us_flight_bigdata_dashboard_spark.flights.views import wide_view
from us_flight_bigdata_dashboard_spark.session import get_spark

AIRPORTS = [
    ("ATL", "Atlanta, GA", "GA"), ("ORD", "Chicago, IL", "IL"),
    ("DFW", "Dallas/Fort Worth, TX", "TX"), ("DEN", "Denver, CO", "CO"),
    ("SFO", "San Francisco, CA", "CA"), ("JFK", "New York, NY", "NY"),
    ("LAX", "Los Angeles, CA", "CA"), ("SEA", "Seattle, WA", "WA"),
    ("IAH", "Houston, TX", "TX"), ("PHX", "Phoenix, AZ", "AZ"),
    ("LAS", "Las Vegas, NV", "NV"), ("CLT", "Charlotte, NC", "NC"),
    ("BOI", "Boise, ID", "ID"), ("MSY", "New Orleans, LA", "LA"),
    ("RDU", "Raleigh/Durham, NC", "NC"), ("PDX", "Portland, OR", "OR"),
]


def synth_flights(spark, n_rows: int):
    """Distributed deterministic synthetic raw flights (hash-derived
    pseudo-randomness — reproducible, no Python loop, scales linearly)."""
    codes = F.array(*[F.lit(c) for c, _ in seeds.AIRLINE_NAMES])
    ap_code = F.array(*[F.lit(a[0]) for a in AIRPORTS])
    ap_city = F.array(*[F.lit(a[1]) for a in AIRPORTS])
    ap_state = F.array(*[F.lit(a[2]) for a in AIRPORTS])

    df = spark.range(n_rows)
    h = lambda salt: F.abs(F.hash(F.col("id") + F.lit(salt)))  # noqa: E731
    day_idx = h(1) % 90  # Q1 2025
    date = F.date_add(F.lit("2025-01-01").cast("date"), day_idx.cast("int"))
    o_idx = (h(2) % len(AIRPORTS) + 1).cast("int")
    d_idx = (h(3) % len(AIRPORTS) + 1).cast("int")
    cancelled = (h(4) % 50 == 0).cast("int")  # ~2%
    dep_delay = (h(5) % 120).cast("double") - 20.0
    ddm = F.greatest(dep_delay, F.lit(0.0))
    dd15 = (ddm >= 15).cast("double")
    crs = (h(6) % 2401).cast("int")
    return df.select(
        F.lit(2025).alias("Year"),
        F.lit(1).alias("Quarter"),
        F.month(date).alias("Month"),
        F.dayofmonth(date).alias("DayofMonth"),
        (((F.dayofweek(date) + 5) % 7) + 1).alias("DayOfWeek"),
        date.cast("string").alias("FlightDate"),
        F.element_at(codes, (h(7) % 14 + 1).cast("int")).alias("Reporting_Airline"),
        F.concat(F.lit("N"), (h(8) % 90000 + 10000).cast("string")).alias("Tail_Number"),
        (h(9) % 9999 + 1).cast("int").alias("Flight_Number_Reporting_Airline"),
        F.element_at(ap_code, o_idx).alias("Origin"),
        F.element_at(ap_city, o_idx).alias("OriginCityName"),
        F.element_at(ap_state, o_idx).alias("OriginState"),
        F.element_at(ap_code, d_idx).alias("Dest"),
        F.element_at(ap_city, d_idx).alias("DestCityName"),
        F.element_at(ap_state, d_idx).alias("DestState"),
        crs.alias("CRSDepTime"),
        F.when(cancelled == 1, F.lit(None)).otherwise(crs.cast("double")).alias("DepTime"),
        F.when(cancelled == 1, F.lit(None)).otherwise(dep_delay).alias("DepDelay"),
        F.when(cancelled == 1, F.lit(None)).otherwise(ddm).alias("DepDelayMinutes"),
        F.when(cancelled == 1, F.lit(None)).otherwise(dd15).alias("DepDel15"),
        F.lit("0000-0059").alias("DepTimeBlk"),
        F.when(cancelled == 1, F.lit(None)).otherwise((h(10) % 400 + 40).cast("double")).alias("ActualElapsedTime"),
        F.when(cancelled == 1, F.lit(None)).otherwise((h(11) % 380 + 20).cast("double")).alias("AirTime"),
        (h(12) % 4500 + 100).cast("double").alias("Distance"),
        F.when(dd15 == 1.0, (h(13) % 30).cast("double")).alias("CarrierDelay"),
        F.when(dd15 == 1.0, (h(14) % 10).cast("double")).alias("WeatherDelay"),
        F.when(dd15 == 1.0, (h(15) % 20).cast("double")).alias("NASDelay"),
        F.when(dd15 == 1.0, (h(16) % 3).cast("double")).alias("SecurityDelay"),
        F.when(dd15 == 1.0, (h(17) % 25).cast("double")).alias("LateAircraftDelay"),
        cancelled.cast("double").alias("Cancelled"),
    )


def main() -> None:
    n_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 1_645_503
    spark = get_spark("bench-flights")
    work = tempfile.mkdtemp(prefix="bench_flights_")
    try:
        raw = synth_flights(spark, n_rows)
        raw.write.mode("overwrite").parquet(f"{work}/raw")  # materialize input
        raw_df = spark.read.parquet(f"{work}/raw")

        # ingest path: clean + write partitioned parquet (E1 / S3)
        t0 = time.perf_counter()
        clean = clean_flights(raw_df)
        clean.withColumn("month_part", F.col("Month")).write.mode("overwrite").partitionBy(
            "month_part"
        ).parquet(f"{work}/fact")
        ingest_s = time.perf_counter() - t0

        # aggregation path: star + wide view + both caches (E2)
        t0 = time.perf_counter()
        clean2 = clean_flights(raw_df)
        star = build_star(clean2)
        wide = wide_view(
            star["fact_flights"], seeds.dim_airline_names(spark), star["dim_airports"], star["dim_calendar"]
        )
        n_airline = airline_monthly_performance(wide).count()
        n_airport = airport_performance(wide, seeds.dim_airport_coords(spark)).count()
        agg_s = time.perf_counter() - t0

        print(
            json.dumps(
                {
                    "metric": "flight_pipeline_reference_scale",
                    "n_rows": n_rows,
                    "ingest_sec": round(ingest_s, 2),
                    "ingest_rows_per_sec": round(n_rows / ingest_s),
                    "aggregation_sec": round(agg_s, 2),
                    "airline_cache_rows": n_airline,
                    "airport_cache_rows": n_airport,
                    "baseline_bars": {"ingest_rows_per_sec_min": 5000, "aggregation_sec_max": 20},
                }
            )
        )
    finally:
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
