"""Serving layer (E3): interactive dashboard queries over the cached
aggregates (src/app.py:29-168).

Design identical to the reference in spirit: all queries run over the two
small additive caches (never base data), one shared filter predicate feeds
every chart (the "联动" linkage, P9), and each chart is an independent lazy
query. ``.cache()`` on the filtered frames replaces ``st.cache_data``.

Quirk Q2 preserved deliberately (SURVEY.md §2.4): the OTP KPI is
flight-WEIGHTED while airline-rank (A7) and monthly-trend (A9) are
UNWEIGHTED means over surviving cache rows — these exact semantics
reproduce the published dashboard numbers bit-for-bit and are golden-tested.
``weighted=True`` variants offer the statistically-correct alternative
(§7 idiomatic upgrade), flagged, never silently substituted.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MONTH_LABELS = {1: "1月", 2: "2月", 3: "3月"}


def apply_shared_filter(
    airline_cache: DataFrame,
    airport_cache: DataFrame,
    months: list[int] | None = None,
    airlines: list[str] | None = None,
) -> tuple[DataFrame, DataFrame]:
    """P9: one conjunctive IN-list predicate applied to both caches
    (src/app.py:83-87)."""

    def _filter(df: DataFrame) -> DataFrame:
        if months is not None:
            df = df.filter(F.col("month").isin(months))
        if airlines is not None:
            df = df.filter(F.col("airline_name").isin(airlines))
        # the ≤400-row filtered frames feed 5+ chart queries — cache them
        # (the engine-side st.cache_data)
        return df.cache()

    return _filter(airline_cache), _filter(airport_cache)


def filter_options(airline_cache: DataFrame) -> tuple[list[int], list[str]]:
    """A11/O3: distinct sorted widget options (src/app.py:56,62)."""
    months = [r[0] for r in airline_cache.select("month").distinct().orderBy("month").collect()]
    airlines = [
        r[0]
        for r in airline_cache.select("airline_name").distinct().orderBy("airline_name").collect()
    ]
    return months, airlines


def kpis(filtered_airline: DataFrame) -> dict[str, float]:
    """A5/A6: total/delayed/cancelled counts + flight-weighted OTP% with
    zero-denominator guard (src/app.py:94-97)."""
    row = filtered_airline.agg(
        F.sum("DepDel15_count").alias("total_flights"),
        F.sum("DepDel15_sum").alias("delayed_flights"),
        F.sum("Is_Cancelled_sum").alias("cancelled_flights"),
        F.sum(F.col("on_time_rate") * F.col("DepDel15_count")).alias("_wsum"),
    ).first()
    total = row["total_flights"] or 0
    otp = (row["_wsum"] / total * 100.0) if total > 0 else 0.0
    return {
        "total_flights": total,
        "on_time_pct": otp,
        "delayed_flights": row["delayed_flights"] or 0,
        "cancelled_flights": row["cancelled_flights"] or 0,
    }


def airline_rank(filtered_airline: DataFrame, weighted: bool = False) -> DataFrame:
    """A7/O2: airlines ranked by mean departure delay, ascending (best
    first). Default faithfully UNWEIGHTED across months (quirk Q2,
    src/app.py:117-118); ``weighted=True`` weights by flight count."""
    if weighted:
        mean_expr = F.sum(F.col("DepDelayMinutes_mean") * F.col("DepDel15_count")) / F.sum(
            "DepDel15_count"
        )
    else:
        mean_expr = F.avg("DepDelayMinutes_mean")
    return (
        filtered_airline.groupBy("airline_name")
        .agg(mean_expr.alias("avg_delay_minutes"))
        .orderBy(F.col("avg_delay_minutes").asc(), F.col("airline_name").asc())
    )


def delay_attribution(filtered_airline: DataFrame) -> DataFrame:
    """A8: four delay-cause totals unpivoted to (cause, minutes) — the
    attribution pie. SecurityDelay is excluded exactly as in the reference
    (src/app.py:133-138)."""
    totals = filtered_airline.agg(
        F.sum("CarrierDelay_sum").alias("carrier"),
        F.sum("WeatherDelay_sum").alias("weather"),
        F.sum("NASDelay_sum").alias("nas"),
        F.sum("LateAircraftDelay_sum").alias("late_aircraft"),
    )
    return totals.select(
        F.expr(
            "stack(4, '航司原因', carrier, '天气影响', weather, "
            "'空管调度', nas, '前序晚到', late_aircraft) AS (cause, minutes)"
        )
    )


def monthly_trend(filtered_airline: DataFrame, weighted: bool = False) -> DataFrame:
    """A9/P11: per-month mean on-time rate (unweighted across selected
    airlines by default — quirk Q2, src/app.py:149-150) + 中文 month label."""
    if weighted:
        mean_expr = F.sum(F.col("on_time_rate") * F.col("DepDel15_count")) / F.sum("DepDel15_count")
    else:
        mean_expr = F.avg("on_time_rate")
    label = F.create_map(*[x for k, v in MONTH_LABELS.items() for x in (F.lit(k), F.lit(v))])
    return (
        filtered_airline.groupBy("month")
        .agg(mean_expr.alias("avg_on_time_rate"))
        .select("month", label[F.col("month")].alias("month_label"), "avg_on_time_rate")
        .orderBy("month")
    )


def geo_rollup(filtered_airport: DataFrame) -> DataFrame:
    """A10 + P10: city-level rollup of the (airline, month, city) cache —
    the additive re-aggregation that powers the map (src/app.py:161-168);
    delay_rate% guarded and rounded as in the reference."""
    agg = filtered_airport.groupBy("origin_city", "lat", "lon").agg(
        F.sum("total_flights").alias("total_flights"),
        F.sum("delayed_flights").alias("delayed_flights"),
    )
    rate = F.col("delayed_flights") / F.col("total_flights") * 100.0
    return agg.withColumn(
        "delay_rate", F.round(F.coalesce(rate, F.lit(0.0)), 2)
    )
