"""Shared test fixtures: one SparkSession per test run + seeded synthetic
raw-flights CSVs per FIXTURES.md §1."""

from __future__ import annotations

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from us_flight_bigdata_dashboard_spark.flights.seeds import AIRLINE_NAMES, AIRPORT_COORDS
from us_flight_bigdata_dashboard_spark.session import get_spark

FIXTURES_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "fixtures")

HUB_AIRPORTS = {
    "ATL": ("Atlanta, GA", "GA"),
    "ORD": ("Chicago, IL", "IL"),
    "DFW": ("Dallas/Fort Worth, TX", "TX"),
    "DEN": ("Denver, CO", "CO"),
    "SFO": ("San Francisco, CA", "CA"),
    "JFK": ("New York, NY", "NY"),
    "LAX": ("Los Angeles, CA", "CA"),
    "SEA": ("Seattle, WA", "WA"),
    "IAH": ("Houston, TX", "TX"),
    "PHX": ("Phoenix, AZ", "AZ"),
    "LAS": ("Las Vegas, NV", "NV"),
    "CLT": ("Charlotte, NC", "NC"),
}
OTHER_AIRPORTS = {
    "BOI": ("Boise, ID", "ID"),
    "MSY": ("New Orleans, LA", "LA"),
    "RDU": ("Raleigh/Durham, NC", "NC"),
    "PDX": ("Portland, OR", "OR"),
    "SLC": ("Salt Lake City, UT", "UT"),
    "TPA": ("Tampa, FL", "FL"),
}
ALL_AIRPORTS = {**HUB_AIRPORTS, **OTHER_AIRPORTS}


@pytest.fixture(scope="session")
def spark():
    s = get_spark("tests", shuffle_partitions=8)
    yield s


def _month_days(month: int) -> int:
    return {1: 31, 2: 28, 3: 31}[month]


def gen_flights_month(rng: np.random.Generator, month: int, n: int, with_cancelled: bool = True):
    """One month of synthetic BTS rows (FIXTURES.md §1 domains: includes the
    2400 rollover, sub-4-digit times, cancelled-null patterns, hub + non-hub
    cities)."""
    import datetime

    codes = [c for c, _ in AIRLINE_NAMES]
    airports = list(ALL_AIRPORTS)
    rows = []
    for _ in range(n):
        day = int(rng.integers(1, _month_days(month) + 1))
        d = datetime.date(2025, month, day)
        airline = codes[int(rng.integers(0, len(codes)))]
        o, de = rng.choice(airports, size=2, replace=False)
        cancelled = bool(rng.random() < 0.02)
        # Force edge HHMM values often enough to matter
        edge = rng.random()
        if edge < 0.02:
            crs = 2400
        elif edge < 0.06:
            crs = int(rng.integers(0, 60))  # '0005'-style
        else:
            crs = int(rng.integers(0, 24)) * 100 + int(rng.integers(0, 60))
        dep_delay = float(np.round(rng.normal(8, 25), 1))
        ddm = max(dep_delay, 0.0)
        dd15 = 1.0 if ddm >= 15 else 0.0
        causes = [None] * 5
        if dd15 == 1.0 and not cancelled:
            split = rng.dirichlet(np.ones(5)) * ddm
            causes = [float(np.round(x, 1)) for x in split]
        rows.append(
            {
                "Year": 2025,
                "Quarter": 1,
                "Month": month,
                "DayofMonth": day,
                "DayOfWeek": d.isoweekday(),
                "FlightDate": d.isoformat(),
                "Reporting_Airline": airline,
                "Tail_Number": None if rng.random() < 0.02 else f"N{int(rng.integers(10000, 99999))}",
                "Flight_Number_Reporting_Airline": int(rng.integers(1, 9999)),
                "Origin": o,
                "OriginCityName": ALL_AIRPORTS[o][0],
                "OriginState": ALL_AIRPORTS[o][1],
                "Dest": de,
                "DestCityName": ALL_AIRPORTS[de][0],
                "DestState": ALL_AIRPORTS[de][1],
                "CRSDepTime": crs,
                "DepTime": None if cancelled else float(min(crs + int(max(dep_delay, 0)) % 60, 2400)),
                "DepDelay": None if cancelled else dep_delay,
                "DepDelayMinutes": None if cancelled else ddm,
                "DepDel15": None if cancelled else dd15,
                "DepTimeBlk": f"{min(crs // 100, 23):02d}00-{min(crs // 100, 23):02d}59",
                "ActualElapsedTime": None if cancelled else float(rng.integers(40, 400)),
                "AirTime": None if cancelled else float(rng.integers(20, 380)),
                "Distance": float(rng.integers(100, 4500)),
                "CarrierDelay": causes[0],
                "WeatherDelay": causes[1],
                "NASDelay": causes[2],
                "SecurityDelay": causes[3],
                "LateAircraftDelay": causes[4],
                **({"Cancelled": 1.0 if cancelled else 0.0} if with_cancelled else {}),
            }
        )
    return rows


@pytest.fixture(scope="session")
def flights_csv_dir(tmp_path_factory):
    """Three monthly CSVs (glob-able), seeded & deterministic."""
    import csv

    root = tmp_path_factory.mktemp("flights_raw")
    rng = np.random.default_rng(42)
    for month in (1, 2, 3):
        rows = gen_flights_month(rng, month, 2000)
        path = root / f"2025_{month:02d}.csv"
        with open(path, "w", newline="") as f:
            w = csv.DictWriter(f, fieldnames=list(rows[0].keys()))
            w.writeheader()
            for r in rows:
                w.writerow({k: ("" if v is None else v) for k, v in r.items()})
    return str(root)


@pytest.fixture(scope="session")
def golden_airline_cache(spark):
    from us_flight_bigdata_dashboard_spark.flights.io import read_cache_csv
    from us_flight_bigdata_dashboard_spark.flights.schemas import AIRLINE_MONTHLY_SCHEMA

    return read_cache_csv(spark, os.path.join(FIXTURES_DIR, "airline_monthly_performance.csv"), AIRLINE_MONTHLY_SCHEMA)


@pytest.fixture(scope="session")
def golden_airport_cache(spark):
    from us_flight_bigdata_dashboard_spark.flights.io import read_cache_csv
    from us_flight_bigdata_dashboard_spark.flights.schemas import AIRPORT_PERFORMANCE_SCHEMA

    return read_cache_csv(spark, os.path.join(FIXTURES_DIR, "airport_performance.csv"), AIRPORT_PERFORMANCE_SCHEMA)
