"""End-to-end pipeline test (SURVEY.md §5 item 2): synthetic raw CSVs →
clean → star → wide view → both caches, compared against a DuckDB oracle
implementing the reference's SQL semantics over the very same CSVs.

The mean column uses the TRUE avg (documented divergence from quirk Q1);
the oracle computes the same deterministic decimal-quantized aggregates, so
equality is exact."""

from __future__ import annotations

import math

import duckdb
import pytest

from us_flight_bigdata_dashboard_spark.flights.pipeline import run_pipeline
from us_flight_bigdata_dashboard_spark.flights.seeds import AIRLINE_NAMES, AIRPORT_COORDS
from us_flight_bigdata_dashboard_spark.functions.exact import sql_davg, sql_dsum


def _canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])

    def cell(v):
        if v is None:
            return "NULL"
        if isinstance(v, float):
            return "NaN" if math.isnan(v) else repr(v)
        return str(v)

    return sorted(tuple(cell(r[i]) for i in order) for r in rows)


def _names_values() -> str:
    return ", ".join(f"('{c}', '{n}')" for c, n in AIRLINE_NAMES)


def _coords_values() -> str:
    return ", ".join(f"('{c.replace(chr(39), chr(39) * 2)}', {la}, {lo})" for c, la, lo in AIRPORT_COORDS)


@pytest.fixture(scope="module")
def outputs(spark, flights_csv_dir):
    return run_pipeline(spark, f"{flights_csv_dir}/2025_0[1-3].csv")


@pytest.fixture(scope="module")
def oracle(flights_csv_dir):
    con = duckdb.connect()
    con.execute(
        f"""
        CREATE VIEW clean AS
        SELECT Month AS month, Reporting_Airline AS code,
               OriginCityName AS origin_city,
               COALESCE(DepDel15, 0) AS DepDel15,
               COALESCE(DepDelayMinutes, 0) AS DepDelayMinutes,
               CAST(COALESCE(Cancelled, 0) AS INTEGER) AS Is_Cancelled,
               COALESCE(CarrierDelay, 0) AS CarrierDelay,
               COALESCE(WeatherDelay, 0) AS WeatherDelay,
               COALESCE(NASDelay, 0) AS NASDelay,
               COALESCE(LateAircraftDelay, 0) AS LateAircraftDelay
        FROM read_csv_auto('{flights_csv_dir}/2025_0*.csv', header=true)
        """
    )
    con.execute(f"CREATE VIEW an(airline_code, airline_name) AS SELECT * FROM (VALUES {_names_values()})")
    con.execute(
        "CREATE VIEW coords AS SELECT origin_city, CAST(lat AS DOUBLE) AS lat, CAST(lon AS DOUBLE) AS lon "
        f"FROM (VALUES {_coords_values()}) t(origin_city, lat, lon)"
    )
    return con


def test_airline_monthly_matches_oracle(outputs, oracle):
    sdf = outputs.airline_monthly
    srows, scols = [tuple(r) for r in sdf.collect()], sdf.columns
    res = oracle.execute(
        f"""
        SELECT airline_name, month,
               COUNT(DepDel15) AS DepDel15_count,
               {sql_dsum("DepDel15")} AS DepDel15_sum,
               {sql_davg("DepDelayMinutes")} AS DepDelayMinutes_mean,
               CAST(SUM(Is_Cancelled) AS BIGINT) AS Is_Cancelled_sum,
               {sql_dsum("CarrierDelay")} AS CarrierDelay_sum,
               {sql_dsum("WeatherDelay")} AS WeatherDelay_sum,
               {sql_dsum("NASDelay")} AS NASDelay_sum,
               {sql_dsum("LateAircraftDelay")} AS LateAircraftDelay_sum,
               1.0 - ({sql_dsum("DepDel15")} / COUNT(DepDel15)) AS on_time_rate
        FROM clean LEFT JOIN an ON code = airline_code
        GROUP BY 1, 2
        """
    )
    ocols = [d[0] for d in res.description]
    orows = res.fetchall()
    assert sorted(scols) == sorted(ocols)
    assert _canon(srows, scols) == _canon(orows, ocols)


def test_airport_performance_matches_oracle(outputs, oracle):
    sdf = outputs.airport_perf
    srows, scols = [tuple(r) for r in sdf.collect()], sdf.columns
    res = oracle.execute(
        f"""
        SELECT airline_name, month, origin_city, total_flights, delayed_flights, lat, lon
        FROM (
          SELECT airline_name, month, origin_city,
                 COUNT(*) AS total_flights,
                 {sql_dsum("DepDel15")} AS delayed_flights
          FROM clean LEFT JOIN an ON code = airline_code
          GROUP BY 1, 2, 3
        ) JOIN coords USING (origin_city)
        """
    )
    ocols = [d[0] for d in res.description]
    orows = res.fetchall()
    assert sorted(scols) == sorted(ocols)
    assert _canon(srows, scols) == _canon(orows, ocols)
    # P13: non-hub cities must be dropped by the inner coords join
    cities = {r[scols.index("origin_city")] for r in srows}
    assert "Boise, ID" not in cities and len(cities) == 12


def test_star_integrity(outputs):
    star = outputs.star
    assert star["dim_airlines"].count() == 14
    assert star["dim_airports"].count() == 18  # 12 hubs + 6 others
    cal = star["dim_calendar"]
    assert cal.count() == cal.select("date_key").distinct().count()
    assert outputs.clean.count() == star["fact_flights"].count() == 6000


def test_wide_view_left_join_preserves_rows(outputs):
    assert outputs.wide.count() == 6000
