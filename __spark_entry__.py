"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).

Implementation lives in ``us_flight_bigdata_dashboard_spark/``; this module
is a thin adapter.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from us_flight_bigdata_dashboard_spark import registry
from us_flight_bigdata_dashboard_spark.operators.relational import q_star_join_agg


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: 4-dim broadcast star join +
    multi-aggregate (the reference's wide-view → airline-monthly pipeline
    re-expressed on the TPC-H-ish star; SURVEY.md §2 J1-J4 + A1)."""
    return q_star_join_agg(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator class from SURVEY.md §2."""
    return registry.queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query (same column names/aliases)."""
    return registry.oracle_sql()
