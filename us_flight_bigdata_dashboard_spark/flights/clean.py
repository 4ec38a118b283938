"""ETL cleaning stage (E1): raw BTS rows → cleaned flights.

Reference semantics preserved exactly (src/data_cleaning.py:11-66,103),
re-expressed as one lazy column-expression chain — no chunking, no Python
row lambdas, no eager materialization. At scale this is a single narrow
(shuffle-free) map stage fused by whole-stage codegen; the reference's 10k-
row write chunking and per-file loop are replaced by distributed partitioned
execution (SURVEY.md §4).

Faithful-mode imputations (SURVEY.md §1.2): DepDel15 null→0 counts cancelled
flights as on-time in downstream denominators; delay-cause nulls→0. Both are
the reference's documented behavior and are load-bearing for golden-output
parity.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from us_flight_bigdata_dashboard_spark.functions.timenorm import hhmm_to_clock

# P5 null-imputation target columns (src/data_cleaning.py:31-34,56-58).
DELAY_CAUSE_COLS = ["CarrierDelay", "WeatherDelay", "NASDelay", "SecurityDelay", "LateAircraftDelay"]
FILL_ZERO_COLS = DELAY_CAUSE_COLS + ["DepDelay", "DepDelayMinutes", "DepDel15"]


def clean_flights(raw: DataFrame) -> DataFrame:
    """Apply the full cleaning chain P3-P8 (projection P1 is the reader's
    schema whitelist; rename P2 happens at star build).

    Handles both raw variants: with a ``Cancelled`` column (flag cast to
    int) or without (fallback: ``ActualElapsedTime IS NULL`` —
    src/data_cleaning.py:61-64).
    """
    df = raw
    # P3: FlightDate → DateType (src/data_cleaning.py:28)
    df = df.withColumn("FlightDate", F.to_date("FlightDate"))
    # P5: null imputation (src/data_cleaning.py:31-34,56-58)
    df = df.na.fill(0, subset=[c for c in FILL_ZERO_COLS if c in df.columns])
    # P4: HHMM → 'HH:MM' — scheduled always (null→'00:00'), actual masked
    # (src/data_cleaning.py:37-53)
    df = df.withColumn("CRSDepTime", hhmm_to_clock(F.col("CRSDepTime"), null_as_midnight=True))
    df = df.withColumn("DepTime", hhmm_to_clock(F.col("DepTime"), null_as_midnight=False))
    # P6: cancellation indicator, with fallback branch (src/data_cleaning.py:61-64)
    if "Cancelled" in df.columns:
        df = df.withColumn("Is_Cancelled", F.coalesce(F.col("Cancelled"), F.lit(0)).cast("int"))
        # P7: drop the raw flag (src/data_cleaning.py:66)
        df = df.drop("Cancelled")
    else:
        df = df.withColumn("Is_Cancelled", F.col("ActualElapsedTime").isNull().cast("int"))
    # P8: weekend indicator under BTS 1=Mon…7=Sun (src/data_cleaning.py:103)
    df = df.withColumn("Is_Weekend", F.when(F.col("DayOfWeek") >= 6, 1).otherwise(0))
    return df
