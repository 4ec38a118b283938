"""Testdata catalog: parquet table loaders + temp-view registration.

Mirrors the reference's source layer (SURVEY.md §2.1 S1-S10) in Spark terms:
one declarative ``spark.read`` per table — no per-file loops, no chunking
(distributed partitioned reads subsume both; reference src/data_cleaning.py:89-116
and src/aggregate_flight_data.py:22-25 do these by hand).

Parquet scans get column pruning + predicate pushdown + row-group min/max
skipping from Catalyst for free; at 100 TB the same call reads a
directory-partitioned table and prunes partitions on filter keys.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one testdata table as a lazy DataFrame.

    ``events.ts`` is written as parquet TIMESTAMP(NANOS), which Spark's
    vectorized reader rejects; we read it as raw nanos (legacy long mode)
    and rebuild a microsecond timestamp with exact integer math (``div`` —
    no double round-trip, which would corrupt > 2^53 nanosecond epochs).
    The DuckDB oracle applies the matching CAST(ts AS TIMESTAMP) truncation.

    ``nanosAsLong`` is set at session build by ``session.get_spark`` so the
    behavior is uniform and visible for every read; the set here is a
    belt-and-suspenders for sessions built by other factories (the driver
    builds a vanilla session). It stays set for the session lifetime — it
    cannot be restored immediately because the returned DataFrame is lazy
    and the scan consults the conf at execution. Any nanos-timestamp
    parquet read therefore surfaces as bigint; route such reads through a
    loader like this one. The flag does not affect ms/us timestamp reads.
    """
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; known: {TABLES}")
    path = os.path.join(sf_dir, f"{name}.parquet")
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(path)
        if dict(df.dtypes).get("ts") == "bigint":
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        return df
    return spark.read.parquet(path)


def register_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Register every testdata table as a temp view; return the DataFrames.

    Equivalent of the reference's star-schema catalog (sql/data_modeling.sql)
    plus the extension tables.
    """
    out: dict[str, DataFrame] = {}
    for name in TABLES:
        df = load_table(spark, sf_dir, name)
        df.createOrReplaceTempView(name)
        out[name] = df
    return out
