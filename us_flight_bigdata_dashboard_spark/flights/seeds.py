"""Seed dimension data the reference assumes out-of-band (SURVEY.md §2.3 gap,
FIXTURES.md §2).

``dim_airline_names``: the wide view selects a.airline_name
(sql/wide_table.sql:11,29-30) from a mapping table created outside the repo;
the 14 code→name pairs are recovered from the golden cache
(airline_monthly_performance.csv col 1) + public IATA codes.

``dim_airport_coords``: the 12-hub-city coordinate lookup the reference
embeds as a literal dict (src/aggregate_flight_data.py:65-72) and applies as
a row-lambda — here a broadcast-joinable dimension (J5/P12 as a join, not a
UDF).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

AIRLINE_NAMES: list[tuple[str, str]] = [
    ("AS", "Alaska Airlines"),
    ("G4", "Allegiant Air"),
    ("AA", "American Airlines"),
    ("DL", "Delta Air Lines"),
    ("MQ", "Envoy Air"),
    ("F9", "Frontier Airlines"),
    ("HA", "Hawaiian Airlines"),
    ("B6", "JetBlue Airways"),
    ("OH", "PSA Airlines"),
    ("YX", "Republic Airways"),
    ("OO", "SkyWest Airlines"),
    ("WN", "Southwest Airlines"),
    ("NK", "Spirit Airlines"),
    ("UA", "United Airlines"),
]

# (origin_city, lat, lon) — exactly the reference's 12-entry lookup
# (src/aggregate_flight_data.py:65-72). Cities outside this table are
# dropped by the geo pipeline (src/aggregate_flight_data.py:76).
AIRPORT_COORDS: list[tuple[str, float, float]] = [
    ("Atlanta, GA", 33.6407, -84.4277),
    ("Chicago, IL", 41.9742, -87.9073),
    ("Dallas/Fort Worth, TX", 32.8998, -97.0403),
    ("Denver, CO", 39.8561, -104.6737),
    ("San Francisco, CA", 37.6213, -122.3790),
    ("New York, NY", 40.6413, -73.7781),
    ("Los Angeles, CA", 33.9416, -118.4085),
    ("Seattle, WA", 47.4502, -122.3088),
    ("Houston, TX", 29.9804, -95.3397),
    ("Phoenix, AZ", 33.4342, -112.0081),
    ("Las Vegas, NV", 36.0840, -115.1537),
    ("Charlotte, NC", 35.2140, -80.9431),
]


def dim_airline_names(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(AIRLINE_NAMES, "airline_code string, airline_name string")


def dim_airport_coords(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(AIRPORT_COORDS, "origin_city string, lat double, lon double")
