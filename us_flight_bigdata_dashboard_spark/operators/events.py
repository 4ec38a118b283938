"""Event-stream analytics operators (batch semantics over ``events``).

The reference's "real-time" is interactive re-filtering of additive
pre-aggregates (SURVEY.md §2.7) — these operators generalize that design to
true event-time analytics: tumbling windows and gap-based sessionization.
The same additive window aggregates run incrementally under Structured
Streaming (streaming/ module) — one logical definition, two execution modes.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from us_flight_bigdata_dashboard_spark.functions.exact import (
    davg,
    dec_to_double,
    dsum,
    fsum,
    sql_davg,
    sql_dec_to_double,
    sql_dsum,
    sql_exact_log2_ctes,
    sql_fsum,
    with_exact_log2,
)
from us_flight_bigdata_dashboard_spark.operators.statistics import _cum_prev, _rank_prev_tied
from us_flight_bigdata_dashboard_spark.sources.catalog import load_table

SESSION_GAP_MIN = 30


def q_events_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour event-time windows per event type: count + exact sum
    (the additive shape that streams incrementally with a watermark).

    Scale note: ``countDistinct`` here is the exact expand pattern — kept
    because this query is an exact-gate oracle target. At 100 TB the
    distinct count becomes ``approx_count_distinct`` (HLL++, mergeable, no
    expand) exactly as the streaming twin already does
    (streaming/events.tumbling_counts) and as the bounds-gated
    ``approx_distinct`` matrix entry demonstrates (operators/advanced.py)."""
    events = load_table(spark, sf_dir, "events")
    return (
        events.groupBy(
            F.date_trunc("hour", F.col("ts")).alias("window_start"),
            F.col("event_type"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            dsum("value", scale=8).alias("sum_value"),
            F.countDistinct("user_id").alias("n_users"),
        )
    )


_ORACLE_EVENTS_TUMBLING = f"""
SELECT CAST(date_trunc('hour', CAST(ts AS TIMESTAMP)) AS TIMESTAMP) AS window_start,
       event_type,
       COUNT(*) AS n_events,
       {sql_dsum("value", scale=8)} AS sum_value,
       COUNT(DISTINCT user_id) AS n_users
FROM events
GROUP BY 1, 2
"""


def q_events_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (30-min inactivity) via window functions:
    lag → new-session flag → running sum = session id → per-user session
    stats. The batch mirror of streaming session windows."""
    events = load_table(spark, sf_dir, "events")
    by_user = Window.partitionBy("user_id").orderBy(F.col("ts").asc(), F.col("event_id").asc())
    with_gap = events.select(
        "user_id",
        "event_id",
        "ts",
        (
            F.when(
                F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts").over(by_user))
                > SESSION_GAP_MIN * 60,
                1,
            )
            .otherwise(0)
            + F.when(F.lag("ts").over(by_user).isNull(), 1).otherwise(0)
        ).alias("is_new_session"),
    )
    sessions = with_gap.withColumn(
        "session_seq",
        F.sum("is_new_session").over(
            by_user.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    return (
        sessions.groupBy("user_id")
        .agg(
            F.max("session_seq").alias("n_sessions"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .withColumn(
            "events_per_session", F.col("n_events").cast("double") / F.col("n_sessions")
        )
    )


_ORACLE_EVENTS_SESSIONIZE = f"""
WITH with_gap AS (
  SELECT user_id, event_id, ts,
         (CASE WHEN epoch(ts) - epoch(LAG(ts) OVER w) > {SESSION_GAP_MIN * 60} THEN 1 ELSE 0 END
          + CASE WHEN LAG(ts) OVER w IS NULL THEN 1 ELSE 0 END) AS is_new_session
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
),
sessions AS (
  SELECT user_id,
         SUM(is_new_session) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
                                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_seq
  FROM with_gap
)
SELECT user_id,
       CAST(MAX(session_seq) AS BIGINT) AS n_sessions,
       COUNT(*) AS n_events,
       CAST(COUNT(*) AS DOUBLE) / MAX(session_seq) AS events_per_session
FROM sessions
GROUP BY 1
"""


def q_events_sliding_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type daily trend with a 3-day centered moving average over the
    daily aggregate (window frame over an additive pre-aggregate — the A10
    two-tier design applied to time series)."""
    events = load_table(spark, sf_dir, "events")
    daily = events.groupBy(
        F.to_date("ts").alias("day"), F.col("event_type")
    ).agg(F.count(F.lit(1)).alias("n_events"), davg("value", scale=8).alias("avg_value"))
    frame = (
        Window.partitionBy("event_type")
        .orderBy(F.col("day").asc())
        .rowsBetween(-1, 1)
    )
    return daily.select(
        "day",
        "event_type",
        "n_events",
        "avg_value",
        F.avg(F.col("n_events").cast("double")).over(frame).alias("n_events_ma3"),
    )


_ORACLE_EVENTS_SLIDING = f"""
WITH daily AS (
  SELECT CAST(ts AS DATE) AS day, event_type,
         COUNT(*) AS n_events,
         {sql_davg("value", scale=8)} AS avg_value
  FROM events
  GROUP BY 1, 2
)
SELECT day, event_type, n_events, avg_value,
       AVG(CAST(n_events AS DOUBLE)) OVER (PARTITION BY event_type ORDER BY day ASC
                                           ROWS BETWEEN 1 PRECEDING AND 1 FOLLOWING) AS n_events_ma3
FROM daily
"""


def q_events_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user session windows via Spark's NATIVE ``session_window``
    aggregate (the same operator that powers streaming session windows),
    cross-checked against the portable lag → new-session-flag → running-sum
    composition in the DuckDB oracle — i.e. the built-in's merge semantics
    are proven equal to the declarative spec, not assumed.

    Boundary semantics pinned by the oracle: a gap of EXACTLY the timeout
    starts a new session (Spark merges only while ``next.ts <
    prev.ts + gap``), so the oracle's new-session flag uses ``>=``.
    ``session_end`` is last event ts + gap, per Spark's definition.

    Scale: one shuffle on user_id; session merging is a sort-based
    in-partition pass — same cost class as the window composition, but
    streaming-ready (state-store backed) for free."""
    events = load_table(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    return (
        events.groupBy(
            F.session_window(F.col("ts"), f"{SESSION_GAP_MIN} minutes").alias("w"),
            F.col("user_id"),
        )
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
        )
    )


_ORACLE_EVENTS_SESSION_WINDOW = f"""
WITH ev AS (
  SELECT user_id, CAST(ts AS TIMESTAMP) AS ts FROM events WHERE ts IS NOT NULL
),
flagged AS (
  SELECT user_id, ts,
         CASE WHEN LAG(ts) OVER w IS NULL
                OR epoch(ts) - epoch(LAG(ts) OVER w) >= {SESSION_GAP_MIN * 60}
              THEN 1 ELSE 0 END AS is_new
  FROM ev
  WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC)
),
sessions AS (
  SELECT user_id, ts,
         SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts ASC
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_seq
  FROM flagged
)
SELECT user_id,
       MIN(ts) AS session_start,
       MAX(ts) + INTERVAL {SESSION_GAP_MIN} MINUTE AS session_end,
       COUNT(*) AS n_events
FROM sessions
GROUP BY user_id, session_seq
"""


def q_events_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series gap filling: per event type, a dense hourly spine over
    that type's active range with zero-filled counts for silent hours —
    the standard pre-step for time-series models and monitoring charts
    (a missing bucket and a zero bucket are different facts).

    Scale shape: the raw events collapse to one hourly pre-aggregate (the
    only scan + shuffle); the spine is generated from the tiny per-type
    bounds row (``sequence`` + explode — narrow, proportional to hours not
    events) and left-joins the pre-aggregate, so gap filling costs
    ~|types|·|hours| regardless of event volume. The pre-aggregate is
    cached because it has two consumers (bounds + join) — uncached, each
    would re-run the full events scan (plan-test-enforced: one parquet
    scan)."""
    events = load_table(spark, sf_dir, "events")
    hourly = events.groupBy(
        F.col("event_type"), F.date_trunc("hour", F.col("ts")).alias("window_start")
    ).agg(F.count(F.lit(1)).alias("n")).cache()
    bounds = hourly.groupBy("event_type").agg(
        F.min("window_start").alias("lo"), F.max("window_start").alias("hi")
    )
    spine = bounds.select(
        "event_type",
        F.explode(F.sequence("lo", "hi", F.expr("interval 1 hour"))).alias("window_start"),
    )
    return spine.join(hourly, ["event_type", "window_start"], "left").select(
        "event_type",
        "window_start",
        F.coalesce(F.col("n"), F.lit(0)).cast("bigint").alias("n_events"),
    )


_ORACLE_EVENTS_GAP_FILL = """
WITH hourly AS (
  SELECT event_type,
         CAST(date_trunc('hour', CAST(ts AS TIMESTAMP)) AS TIMESTAMP) AS window_start,
         COUNT(*) AS n
  FROM events
  GROUP BY 1, 2
),
bounds AS (
  SELECT event_type, MIN(window_start) AS lo, MAX(window_start) AS hi FROM hourly GROUP BY 1
),
spine AS (
  SELECT event_type, unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS window_start FROM bounds
)
SELECT s.event_type, s.window_start,
       CAST(COALESCE(h.n, 0) AS BIGINT) AS n_events
FROM spine s LEFT JOIN hourly h USING (event_type, window_start)
"""


def q_events_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered conversion funnel view → click → purchase: a user advances a
    step only with an event strictly after their previous step's first
    completion (the product-analytics primitive the reference's dashboard
    has no analog for).

    Single-shuffle shape (the ClickHouse ``windowFunnel`` pattern done
    relationally): ONE groupBy(user) computes the first view and collects
    the user's click/purchase timestamps; the dependent steps (first click
    after the view, first purchase after that click) are then narrow
    array-HOF expressions over that per-user state — no self-join of the
    raw stream, no second shuffle. Per-user collected state is bounded by
    that user's click+purchase count; a pathological power-user key at
    100 TB would re-introduce skew, at which point the fallback is the
    stacked min(CASE)-with-join chain the oracle states (same result,
    3 user-keyed shuffles). Funnel totals reduce to one row."""
    events = load_table(spark, sf_dir, "events")
    per_user = (
        events.groupBy("user_id")
        .agg(
            F.min(F.when(F.col("event_type") == "view", F.col("ts"))).alias("t_view"),
            F.collect_list(
                F.when(
                    F.col("event_type").isin("click", "purchase"),
                    F.struct(F.col("ts"), F.col("event_type")),
                )
            ).alias("later"),
        )
        .withColumn(
            "t_click",
            F.array_min(
                F.transform(
                    F.filter(
                        F.col("later"),
                        lambda e: (e["event_type"] == "click") & (e["ts"] > F.col("t_view")),
                    ),
                    lambda e: e["ts"],
                )
            ),
        )
        .withColumn(
            "t_purchase",
            F.array_min(
                F.transform(
                    F.filter(
                        F.col("later"),
                        lambda e: (e["event_type"] == "purchase") & (e["ts"] > F.col("t_click")),
                    ),
                    lambda e: e["ts"],
                )
            ),
        )
    )
    return per_user.agg(
        F.count(F.lit(1)).alias("n_users"),
        F.sum(F.when(F.col("t_view").isNotNull(), 1).otherwise(0)).alias("n_viewed"),
        F.sum(F.when(F.col("t_click").isNotNull(), 1).otherwise(0)).alias("n_clicked"),
        F.sum(F.when(F.col("t_purchase").isNotNull(), 1).otherwise(0)).alias("n_purchased"),
    )


_ORACLE_EVENTS_FUNNEL = """
WITH per_user AS (
  SELECT user_id,
         MIN(CASE WHEN event_type = 'view' THEN ts END) AS t_view
  FROM events GROUP BY 1
), clicked AS (
  SELECT p.user_id, p.t_view,
         MIN(CASE WHEN e.event_type = 'click' AND e.ts > p.t_view THEN e.ts END) AS t_click
  FROM per_user p LEFT JOIN events e USING (user_id)
  GROUP BY 1, 2
), purchased AS (
  SELECT c.user_id, c.t_view, c.t_click,
         MIN(CASE WHEN e.event_type = 'purchase' AND e.ts > c.t_click THEN e.ts END) AS t_purchase
  FROM clicked c LEFT JOIN events e USING (user_id)
  GROUP BY 1, 2, 3
)
SELECT COUNT(*) AS n_users,
       CAST(SUM(CASE WHEN t_view IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_viewed,
       CAST(SUM(CASE WHEN t_click IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_clicked,
       CAST(SUM(CASE WHEN t_purchase IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_purchased
FROM purchased
"""


def q_events_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention matrix: users grouped by first-seen day, tracked by
    how many return N days later (the activation/retention table behind
    every growth dashboard).

    Shape: first-seen day is one min-aggregate per user (user-keyed
    shuffle); the retention matrix joins the user-day activity (already
    distinct per user×day, so dimension-sized relative to raw events)
    back to the cohort map on user_id and re-aggregates on (cohort_day,
    day_offset). Two user-keyed shuffles + one matrix-keyed agg — no raw
    event self-join; at 100 TB both shuffle inputs are pre-deduped far
    below the event count."""
    events = load_table(spark, sf_dir, "events")
    user_days = events.select(
        "user_id", F.to_date("ts").alias("active_day")
    ).distinct()
    cohorts = user_days.groupBy("user_id").agg(F.min("active_day").alias("cohort_day"))
    return (
        user_days.join(cohorts, "user_id")
        .select(
            "cohort_day",
            F.datediff(F.col("active_day"), F.col("cohort_day")).alias("day_offset"),
            "user_id",
        )
        .groupBy("cohort_day", "day_offset")
        .agg(F.countDistinct("user_id").alias("n_users"))
    )


_ORACLE_EVENTS_COHORT_RETENTION = """
WITH user_days AS (
  SELECT DISTINCT user_id, CAST(ts AS DATE) AS active_day FROM events
), cohorts AS (
  SELECT user_id, MIN(active_day) AS cohort_day FROM user_days GROUP BY 1
)
SELECT c.cohort_day,
       date_diff('day', c.cohort_day, u.active_day) AS day_offset,
       COUNT(DISTINCT u.user_id) AS n_users
FROM user_days u JOIN cohorts c USING (user_id)
GROUP BY 1, 2
"""


# ---------------------------------------------------------------------------
# N-day return rate (bounded forward-window engagement)
# ---------------------------------------------------------------------------

RETURN_WINDOW_DAYS = 7


def q_events_return_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-day {RETURN_WINDOW_DAYS}-day return rate: of the users active
    on day d, what share is active again in (d, d+{RETURN_WINDOW_DAYS}]
    — the short-horizon engagement complement of cohort retention (which
    tracks first-seen cohorts, not every day's actives).

    Plan: the fact collapses once to distinct (user, day) activity; a
    per-user LEAD over day order gives each activity row its NEXT active
    day (one user-keyed window — no self-join at all, unlike the naive
    day-range formulation), and "returned" is a pure comparison. Daily
    rollup is count + conditional count; the rate is an exact integer
    division."""
    events = load_table(spark, sf_dir, "events")
    activity = events.select("user_id", F.to_date("ts").alias("day")).distinct()
    nxt = F.lead("day").over(
        Window.partitionBy("user_id").orderBy(F.asc("day"))
    )
    flagged = activity.select(
        "day",
        (
            nxt.isNotNull()
            & (F.datediff(nxt, F.col("day")) <= RETURN_WINDOW_DAYS)
        ).cast("int").alias("returned"),
    )
    return (
        flagged.groupBy("day")
        .agg(
            F.count(F.lit(1)).alias("n_active"),
            F.sum("returned").alias("n_returned"),
            (F.sum("returned").cast("double") / F.count(F.lit(1))).alias(
                "return_rate"
            ),
        )
        .orderBy("day")
    )


_ORACLE_EVENTS_RETURN_RATE = f"""
WITH activity AS (
  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
), flagged AS (
  SELECT day,
         CASE WHEN lead(day) OVER (PARTITION BY user_id ORDER BY day ASC) IS NOT NULL
               AND date_diff('day', day,
                             lead(day) OVER (PARTITION BY user_id ORDER BY day ASC))
                   <= {RETURN_WINDOW_DAYS}
              THEN 1 ELSE 0 END AS returned
  FROM activity
)
SELECT day, COUNT(*) AS n_active, CAST(SUM(returned) AS BIGINT) AS n_returned,
       CAST(SUM(returned) AS DOUBLE) / COUNT(*) AS return_rate
FROM flagged
GROUP BY day
ORDER BY day
"""


# ---------------------------------------------------------------------------
# Cohort LTV curve (cumulative revenue per cohort age)
# ---------------------------------------------------------------------------

def q_events_cohort_ltv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort LTV curve: cumulative purchase revenue per user, by cohort
    week (first-seen day's week) and age in days — the monetary twin of
    the retention matrix (how much a cohort has spent by age N, per
    member).

    Plan: cohort map = one min-aggregate per user; purchase revenue joins
    it on user_id and aggregates additively on (cohort_week, age) —
    decimal-exact sums. The CUMULATIVE sum runs as a window over the
    (cohort-sized) aggregate with DECIMAL addends (association-free — a
    double running sum would differ between Spark's sequential and
    DuckDB's segment-tree window evaluation), then divides by the cohort
    population for per-member LTV."""
    events = load_table(spark, sf_dir, "events")
    first_seen = events.groupBy("user_id").agg(
        F.min(F.to_date("ts")).alias("first_day")
    )
    cohorts = first_seen.select(
        "user_id",
        F.date_trunc("week", F.col("first_day")).cast("date").alias("cohort_week"),
    )
    cohort_size = cohorts.groupBy("cohort_week").agg(
        F.count(F.lit(1)).alias("cohort_users")
    )
    purchases = events.filter(F.col("event_type") == "purchase").select(
        "user_id", F.to_date("ts").alias("day"), "value"
    )
    aged = (
        purchases.join(cohorts, "user_id")
        .join(first_seen, "user_id")
        .select(
            "cohort_week",
            F.datediff(F.col("day"), F.col("first_day")).alias("age_days"),
            "value",
        )
        .groupBy("cohort_week", "age_days")
        .agg(dsum("value", scale=8).cast("decimal(38,8)").alias("rev"))
    )
    w = Window.partitionBy("cohort_week").orderBy(F.asc("age_days")).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return (
        aged.withColumn("cum_rev", F.sum("rev").over(w))
        .join(F.broadcast(cohort_size), "cohort_week")
        .select(
            "cohort_week",
            "age_days",
            F.col("rev").cast("double").alias("revenue"),
            F.col("cum_rev").cast("double").alias("cum_revenue"),
            (
                F.col("cum_rev").cast("double") / F.col("cohort_users")
            ).alias("ltv_per_user"),
        )
        .orderBy("cohort_week", "age_days")
    )


_ORACLE_EVENTS_COHORT_LTV = f"""
WITH first_seen AS (
  SELECT user_id, MIN(CAST(ts AS DATE)) AS first_day FROM events GROUP BY user_id
), cohorts AS (
  SELECT user_id, first_day,
         CAST(date_trunc('week', first_day) AS DATE) AS cohort_week
  FROM first_seen
), cohort_size AS (
  SELECT cohort_week, COUNT(*) AS cohort_users FROM cohorts GROUP BY cohort_week
), aged AS (
  SELECT cohort_week,
         date_diff('day', first_day, CAST(ts AS DATE)) AS age_days,
         CAST({sql_dsum("value", scale=8)} AS DECIMAL(38,8)) AS rev
  FROM events JOIN cohorts USING (user_id)
  WHERE event_type = 'purchase'
  GROUP BY 1, 2
)
SELECT cohort_week, age_days,
       CAST(rev AS DOUBLE) AS revenue,
       CAST(SUM(rev) OVER (PARTITION BY cohort_week ORDER BY age_days ASC
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
            AS DOUBLE) AS cum_revenue,
       CAST(SUM(rev) OVER (PARTITION BY cohort_week ORDER BY age_days ASC
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
            AS DOUBLE) / cohort_users AS ltv_per_user
FROM aged JOIN cohort_size USING (cohort_week)
ORDER BY cohort_week, age_days
"""


# ---------------------------------------------------------------------------
# Z-score anomaly detection
# ---------------------------------------------------------------------------

ZSCORE_THRESHOLD = 3.0


def q_events_zscore_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type z-score anomaly counting: events whose ``value``
    deviates more than 3σ from their type's mean — the standard streaming
    telemetry outlier gate, here as a two-pass batch operator.

    Determinism: mean and variance come from decimal-exact ``dsum`` of
    value and value² (E[X²]−E[X]², exact sums → one IEEE division/multiply
    each), NOT the engines' ``stddev`` (Welford/merge order varies per
    engine and partitioning, so last-ulp drift would break the hash gate).
    σ = sqrt(var) is correctly-rounded on both engines.

    Scale shape: pass 1 is a hash-agg to |event_type| rows (map-side
    combine, bytes shuffle); the tiny stats table broadcasts back onto the
    scan for pass 2 — no row-proportional shuffle anywhere. The same two
    sums are the mergeable state a streaming twin would keep.
    """
    events = load_table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    stats = events.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        dsum("value", scale=8).alias("_s1"),
        dsum(F.col("value") * F.col("value"), scale=8).alias("_s2"),
    )
    stats = stats.select(
        "event_type",
        "n_events",
        (F.col("_s1") / F.col("n_events")).alias("_mean"),
        F.sqrt(
            F.col("_s2") / F.col("n_events")
            - (F.col("_s1") / F.col("n_events")) * (F.col("_s1") / F.col("n_events"))
        ).alias("_sigma"),
    )
    flagged = events.join(F.broadcast(stats), "event_type").withColumn(
        "_is_anom",
        F.abs(F.col("value") - F.col("_mean")) > F.lit(ZSCORE_THRESHOLD) * F.col("_sigma"),
    )
    return (
        flagged.groupBy("event_type")
        .agg(
            F.max("n_events").alias("n_events"),
            F.sum(F.when(F.col("_is_anom"), 1).otherwise(0)).alias("n_anomalies"),
            F.min(F.when(F.col("_is_anom"), F.col("value"))).alias("min_anom_value"),
            F.max(F.when(F.col("_is_anom"), F.col("value"))).alias("max_anom_value"),
        )
    )


_ORACLE_EVENTS_ZSCORE = f"""
WITH ev AS (SELECT event_type, value FROM events WHERE value IS NOT NULL),
stats AS (
  SELECT event_type, COUNT(*) AS n_events,
         {sql_dsum("value", scale=8)} AS _s1,
         {sql_dsum("value * value", scale=8)} AS _s2
  FROM ev GROUP BY event_type
),
norm AS (
  SELECT event_type, n_events, _s1 / n_events AS _mean,
         sqrt(_s2 / n_events - (_s1 / n_events) * (_s1 / n_events)) AS _sigma
  FROM stats
)
SELECT ev.event_type,
       MAX(n.n_events) AS n_events,
       CAST(SUM(CASE WHEN abs(ev.value - n._mean) > {ZSCORE_THRESHOLD} * n._sigma
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_anomalies,
       MIN(CASE WHEN abs(ev.value - n._mean) > {ZSCORE_THRESHOLD} * n._sigma
                THEN ev.value END) AS min_anom_value,
       MAX(CASE WHEN abs(ev.value - n._mean) > {ZSCORE_THRESHOLD} * n._sigma
                THEN ev.value END) AS max_anom_value
FROM ev JOIN norm n USING (event_type)
GROUP BY ev.event_type
"""


# ---------------------------------------------------------------------------
# Event transition mining (first-order Markov counts)
# ---------------------------------------------------------------------------

def q_events_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order transition counts between consecutive event types per
    user — the Markov-chain substrate of journey mining, next-action
    prediction features, and bot detection (improbable transition chains).

    Scale shape: one shuffle to (user, ts)-sort per user, ``lag`` within
    the keyed window (no self-join of the stream against itself — the
    naive SQL formulation — which would double the shuffled bytes), then a
    hash-agg over the tiny (from, to) domain. Ties on ts are broken by
    event_id so the sequence is total-ordered and the oracle agrees.
    """
    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = events.select(
        "user_id",
        F.lag("event_type").over(w).alias("from_type"),
        F.col("event_type").alias("to_type"),
    ).filter(F.col("from_type").isNotNull())
    return (
        pairs.groupBy("from_type", "to_type")
        .agg(
            F.count(F.lit(1)).alias("n_transitions"),
            F.countDistinct("user_id").alias("n_users"),
        )
    )


_ORACLE_EVENTS_TRANSITIONS = """
WITH seq AS (
  SELECT user_id,
         lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS from_type,
         event_type AS to_type
  FROM events
)
SELECT from_type, to_type,
       COUNT(*) AS n_transitions,
       COUNT(DISTINCT user_id) AS n_users
FROM seq
WHERE from_type IS NOT NULL
GROUP BY 1, 2
"""




def q_events_activity_islands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Consecutive-active-day ISLANDS per user — the date-contiguity
    gaps-and-islands (distinct active days, islands where day − rank is
    constant), reported as the island-length histogram plus how many
    users' LONGEST run has that length. The calendar twin of the
    event-type streak processor (``streaming_streaks_replay`` folds
    type-runs sequentially; this derives date-runs relationally — two
    different machineries for the "N in a row" family).

    Exactness: days are epoch-day integers; the island id (day − rank)
    is exact integer arithmetic; everything after is counts. Scale
    shape: one distinct over (user, day) — map-side combinable — one
    user-keyed rank window, two tiny aggs over the islands frame; the
    histogram is bounded by the date span, not the data."""
    events = load_table(spark, sf_dir, "events")
    days = (
        events.filter(F.col("ts").isNotNull())
        .select(
            "user_id",
            F.expr("CAST(unix_timestamp(ts) DIV 86400 AS BIGINT)").alias("d"),
        )
        .distinct()
    )
    w = Window.partitionBy("user_id").orderBy("d")
    islands = (
        days.select(
            "user_id", (F.col("d") - F.row_number().over(w)).alias("island_id")
        )
        .groupBy("user_id", "island_id")
        .agg(F.count(F.lit(1)).alias("island_len"))
    )
    hist = islands.groupBy("island_len").agg(F.count(F.lit(1)).alias("n_islands"))
    longest = (
        islands.groupBy("user_id")
        .agg(F.max("island_len").alias("island_len"))
        .groupBy("island_len")
        .agg(F.count(F.lit(1)).alias("n_users_longest"))
    )
    return (
        hist.join(longest, "island_len", "left")
        .select(
            "island_len",
            "n_islands",
            F.coalesce(F.col("n_users_longest"), F.lit(0))
            .cast("long")
            .alias("n_users_longest"),
        )
        .orderBy("island_len")
    )


_ORACLE_ACTIVITY_ISLANDS = """
WITH days_t AS (
  SELECT DISTINCT user_id,
         CAST(floor(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT) // 86400 AS d
  FROM events WHERE ts IS NOT NULL
), islands AS (
  SELECT user_id, d - ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY d)
           AS island_id
  FROM days_t
), sized AS (
  SELECT user_id, island_id, COUNT(*) AS island_len
  FROM islands GROUP BY 1, 2
), hist AS (
  SELECT island_len, COUNT(*) AS n_islands FROM sized GROUP BY 1
), longest AS (
  SELECT island_len, COUNT(*) AS n_users_longest
  FROM (SELECT user_id, MAX(island_len) AS island_len FROM sized GROUP BY 1)
  GROUP BY 1
)
SELECT h.island_len, h.n_islands,
       CAST(COALESCE(l.n_users_longest, 0) AS BIGINT) AS n_users_longest
FROM hist h LEFT JOIN longest l USING (island_len)
ORDER BY h.island_len
"""



TRIGRAM_TOP = 25


def q_events_path_trigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frequent 3-step journey paths: counts of consecutive event-type
    TRIGRAMS per user — the sequence-mining rung above
    ``events_transitions`` (first-order pairs miss patterns like
    view→click→purchase vs view→click→error, the difference between a
    converting funnel and a broken one). Support plus corpus share per
    path, top-{top} under a total order.

    Scale shape: the same single keyed-window shuffle as transitions —
    two ``lead``s instead of one ``lag``, NO self-joins (the naive
    3-way-join formulation shuffles the stream three times); the count
    agg runs over the |types|³ ≤ 125 path domain, map-side combinable.
    Ties on ts break by event_id, so the sequence is total-ordered and
    the oracle agrees.
    """
    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    tri = events.select(
        F.col("event_type").alias("t1"),
        F.lead("event_type", 1).over(w).alias("t2"),
        F.lead("event_type", 2).over(w).alias("t3"),
    ).filter(F.col("t2").isNotNull() & F.col("t3").isNotNull())
    counts = tri.groupBy("t1", "t2", "t3").agg(F.count(F.lit(1)).alias("n_paths"))
    tot = counts.agg(F.sum("n_paths").alias("total"))
    return (
        counts.crossJoin(F.broadcast(tot))
        .select(
            "t1",
            "t2",
            "t3",
            "n_paths",
            (F.col("n_paths").cast("double") / F.col("total").cast("double")).alias(
                "share"
            ),
        )
        .orderBy(F.desc("n_paths"), "t1", "t2", "t3")
        .limit(TRIGRAM_TOP)
    )
q_events_path_trigrams.__doc__ = q_events_path_trigrams.__doc__ and q_events_path_trigrams.__doc__.format(top=TRIGRAM_TOP)


_ORACLE_EVENTS_PATH_TRIGRAMS = f"""
WITH seq AS (
  SELECT event_type AS t1,
         lead(event_type, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS t2,
         lead(event_type, 2) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS t3
  FROM events
), counts AS (
  SELECT t1, t2, t3, COUNT(*) AS n_paths
  FROM seq WHERE t2 IS NOT NULL AND t3 IS NOT NULL
  GROUP BY 1, 2, 3
), tot AS (SELECT SUM(n_paths) AS total FROM counts)
SELECT t1, t2, t3, CAST(n_paths AS BIGINT) AS n_paths,
       CAST(n_paths AS DOUBLE) / CAST(total AS DOUBLE) AS share
FROM counts CROSS JOIN tot
ORDER BY n_paths DESC, t1, t2, t3
LIMIT {TRIGRAM_TOP}
"""

# ---------------------------------------------------------------------------
# Sweep-line session concurrency
# ---------------------------------------------------------------------------

def q_events_max_concurrency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Peak concurrent sessions per day via the sweep-line algorithm:
    sessions (native ``session_window`` per user) explode into +1/-1
    boundary events, a running sum over the time-ordered boundary stream
    is the live-session count, and its per-day max is the capacity-
    planning number (peak concurrency) no simple aggregate can produce.

    Tie semantics pinned for the oracle: boundaries sort by (ts, delta
    asc, user asc), so at an identical instant a closing session (-1)
    is processed before an opening one — "end-exclusive" concurrency.
    Day attribution is by boundary timestamp; the running sum partitions
    by day (each day's count starts at its own first boundary — sessions
    here are bounded by the 30-min gap, so midnight straddle is rare and
    the convention is identical in both engines).

    Scale shape: the boundary stream is 2 rows per session (≪ events);
    the per-day window sort is the sweep — at 100 TB partition the sweep
    by (day) exactly as here, one partition per day-shard.
    """
    events = load_table(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    sessions = (
        events.groupBy(
            F.session_window(F.col("ts"), f"{SESSION_GAP_MIN} minutes").alias("w"),
            F.col("user_id"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .select("user_id", F.col("w.start").alias("s_start"), F.col("w.end").alias("s_end"))
    )
    bounds = sessions.select(
        F.col("s_start").alias("ts"), F.lit(1).alias("delta"), "user_id"
    ).unionAll(
        sessions.select(F.col("s_end").alias("ts"), F.lit(-1).alias("delta"), "user_id")
    )
    day = F.to_date("ts")
    w = Window.partitionBy(day.alias("day")).orderBy(
        F.col("ts").asc(), F.col("delta").asc(), F.col("user_id").asc()
    ).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    live = bounds.select(day.alias("day"), F.sum("delta").over(w).alias("live"))
    return live.groupBy("day").agg(F.max("live").alias("max_concurrent"))


_ORACLE_EVENTS_MAX_CONCURRENCY = f"""
WITH ev AS (
  SELECT user_id, CAST(ts AS TIMESTAMP) AS ts FROM events WHERE ts IS NOT NULL
),
flagged AS (
  SELECT user_id, ts,
         CASE WHEN LAG(ts) OVER w IS NULL
                OR epoch(ts) - epoch(LAG(ts) OVER w) >= {SESSION_GAP_MIN * 60}
              THEN 1 ELSE 0 END AS is_new
  FROM ev
  WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC)
),
numbered AS (
  SELECT user_id, ts,
         SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts ASC
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_seq
  FROM flagged
),
sessions AS (
  SELECT user_id, MIN(ts) AS s_start,
         MAX(ts) + INTERVAL {SESSION_GAP_MIN} MINUTE AS s_end
  FROM numbered GROUP BY user_id, session_seq
),
bounds AS (
  SELECT s_start AS ts, 1 AS delta, user_id FROM sessions
  UNION ALL
  SELECT s_end AS ts, -1 AS delta, user_id FROM sessions
),
live AS (
  SELECT CAST(ts AS DATE) AS day,
         SUM(delta) OVER (PARTITION BY CAST(ts AS DATE)
                          ORDER BY ts ASC, delta ASC, user_id ASC
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS live
  FROM bounds
)
SELECT day, CAST(MAX(live) AS BIGINT) AS max_concurrent
FROM live
GROUP BY day
"""


# ---------------------------------------------------------------------------
# OHLC resampling (time-series downsample)
# ---------------------------------------------------------------------------


def q_events_ohlc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Open/high/low/close resampling of the event value series per
    (event_type, hour) — the financial-bar / metrics-downsample primitive
    that turns a raw event stream into a fixed-rate series.

    Open/close are order statistics, not additive aggregates, so they
    need a within-window total order: row_number under (ts, event_id) —
    event_id breaks timestamp ties deterministically — once ascending and
    once descending, then a conditional max per window. Both windows AND
    the final aggregate share the same partition key, so the whole
    operator is ONE shuffle: Catalyst plans a single Exchange and the two
    sorts + agg run in the same stage pipeline.
    """
    events = load_table(spark, sf_dir, "events")
    base = events.select(
        F.date_trunc("hour", F.col("ts")).alias("window_start"),
        "event_type",
        "ts",
        "event_id",
        "value",
    )
    w_asc = Window.partitionBy("window_start", "event_type").orderBy(
        F.asc("ts"), F.asc("event_id")
    )
    w_desc = Window.partitionBy("window_start", "event_type").orderBy(
        F.desc("ts"), F.desc("event_id")
    )
    return (
        base.withColumn("rn_a", F.row_number().over(w_asc))
        .withColumn("rn_d", F.row_number().over(w_desc))
        .groupBy("window_start", "event_type")
        .agg(
            F.max(F.when(F.col("rn_a") == 1, F.col("value"))).alias("open"),
            F.max("value").alias("high"),
            F.min("value").alias("low"),
            F.max(F.when(F.col("rn_d") == 1, F.col("value"))).alias("close"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )


_ORACLE_EVENTS_OHLC = """
WITH base AS (
  SELECT CAST(date_trunc('hour', CAST(ts AS TIMESTAMP)) AS TIMESTAMP) AS window_start,
         event_type, ts, event_id, value
  FROM events
),
ranked AS (
  SELECT *,
         ROW_NUMBER() OVER (PARTITION BY window_start, event_type
                            ORDER BY ts ASC, event_id ASC) AS rn_a,
         ROW_NUMBER() OVER (PARTITION BY window_start, event_type
                            ORDER BY ts DESC, event_id DESC) AS rn_d
  FROM base
)
SELECT window_start, event_type,
       MAX(CASE WHEN rn_a = 1 THEN value END) AS open,
       MAX(value) AS high,
       MIN(value) AS low,
       MAX(CASE WHEN rn_d = 1 THEN value END) AS close,
       COUNT(*) AS n_events
FROM ranked
GROUP BY window_start, event_type
"""


# ---------------------------------------------------------------------------
# Last-touch attribution
# ---------------------------------------------------------------------------

ATTR_TOUCH_TYPES = ["view", "click"]  # touchpoint channels; else 'direct'


def q_events_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-touch purchase attribution: each purchase is credited to the
    most recent *preceding* touchpoint event (view/click) by the same
    user, or 'direct' if the user has no prior touch; output is purchases
    and exact attributed revenue per channel.

    The carry-forward is ``last(..., ignorenulls=True)`` over a
    ROWS-frame ending at 1 PRECEDING — the IGNORE-NULLS window pattern
    (distinct from lag/lead and the session running-sum used elsewhere:
    those read fixed offsets, this scans back an unbounded frame for the
    last match, which Spark evaluates in one pass per partition). One
    shuffle on user_id, one running-state window, then a tiny channel
    agg; the frame never re-sorts per row, so cost is O(events) at any
    scale. Ordering is tie-broken by the unique event_id, and revenue
    uses the decimal-quantized ``dsum`` — both engines agg the same
    exact values, so the gate stays a hash compare."""
    events = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts").asc(), F.col("event_id").asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    touch = F.last(
        F.when(F.col("event_type").isin(*ATTR_TOUCH_TYPES), F.col("event_type")),
        ignorenulls=True,
    ).over(w)
    return (
        events.withColumn("touch", touch)
        .filter(F.col("event_type") == "purchase")
        .groupBy(F.coalesce(F.col("touch"), F.lit("direct")).alias("channel"))
        .agg(
            F.count(F.lit(1)).alias("n_purchases"),
            dsum("value", scale=8).alias("attributed_value"),
        )
    )


_ORACLE_EVENTS_ATTRIBUTION = f"""
WITH touched AS (
  SELECT event_type, value,
         LAST_VALUE(CASE WHEN event_type IN ('view', 'click') THEN event_type END IGNORE NULLS)
           OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS touch
  FROM events
)
SELECT COALESCE(touch, 'direct') AS channel,
       COUNT(*) AS n_purchases,
       {sql_dsum("value", scale=8)} AS attributed_value
FROM touched
WHERE event_type = 'purchase'
GROUP BY 1
"""


# ---------------------------------------------------------------------------
# Activity concentration (top-decile share — abuse/bot screening signal)
# ---------------------------------------------------------------------------

CONC_BUCKETS = 10


def q_events_activity_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Activity concentration profile: users ranked into {CONC_BUCKETS}
    NTILE deciles by event count, with each decile's share of total
    events — the Lorenz-curve view that flags bot/abuse skew ("decile 1
    produces 60% of traffic") and sets sampling caps for training-data
    collection. Per-user counts collapse the fact first; the NTILE runs
    over the user-sized aggregate (bucketed-rank upgrade path at larger
    domains, as in RFM); shares divide exact integers against a broadcast
    1-row total."""
    events = load_table(spark, sf_dir, "events")
    # one lazily-materialized per-user rollup feeds the rank, the NTILE
    # count AND the grand total (r15: total/n were separate re-aggregations
    # of the events fact before)
    per_user = (
        events.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .withColumn("_negn", -F.col("n_events"))
        .localCheckpoint(eager=False)
    )
    total = per_user.agg(F.sum("n_events").alias("total_events"))
    # NTILE from the bucketed global rank (r14 optimization — no
    # single-task sort): q = n DIV k, r = n MOD k, first r tiles hold
    # q+1 rows — the exact NTILE definition of both engines. The event
    # count is TIE-HEAVY (the r15 skew audit measured 5.5% of users in
    # one count bucket), so the rank uses the two-level tie decomposition
    # (distinct-count offsets + within-count user_id rank); n comes from
    # the same distinct-count frame (with_totals). Value-identical.
    rn = F.col("_rp") + F.lit(1)
    n = F.col("_rp_tot")
    q = F.floor(n / F.lit(CONC_BUCKETS)).cast("long")
    r = n % F.lit(CONC_BUCKETS)
    big = r * (q + F.lit(1))
    ntile = (
        F.when(rn <= big, F.floor((rn - 1) / (q + F.lit(1))))
        .otherwise(r + F.floor((rn - big - F.lit(1)) / q))
        + F.lit(1)
    ).cast("int")
    deciles = _rank_prev_tied(
        per_user, "_negn", ["user_id"], "_rp", with_totals=True
    ).select("user_id", "n_events", ntile.alias("decile"))
    return (
        deciles.groupBy("decile")
        .agg(
            F.count(F.lit(1)).alias("n_users"),
            F.sum("n_events").alias("decile_events"),
        )
        .crossJoin(F.broadcast(total))
        .select(
            "decile",
            "n_users",
            "decile_events",
            (
                F.col("decile_events").cast("double")
                / F.col("total_events").cast("double")
            ).alias("event_share"),
        )
        .orderBy("decile")
    )


_ORACLE_EVENTS_ACTIVITY_CONCENTRATION = f"""
WITH per_user AS (
  SELECT user_id, COUNT(*) AS n_events FROM events GROUP BY user_id
), deciles AS (
  SELECT user_id, n_events,
         NTILE({CONC_BUCKETS}) OVER (ORDER BY n_events DESC, user_id ASC) AS decile
  FROM per_user
)
SELECT decile, COUNT(*) AS n_users, CAST(SUM(n_events) AS BIGINT) AS decile_events,
       CAST(SUM(n_events) AS DOUBLE)
         / CAST((SELECT SUM(n_events) FROM per_user) AS DOUBLE) AS event_share
FROM deciles
GROUP BY decile
ORDER BY decile
"""


# ---------------------------------------------------------------------------
# DAU/MAU stickiness ratio (two bounded range joins over one activity table)
# ---------------------------------------------------------------------------

MAU_WINDOW_DAYS = 30


def q_events_dau_mau(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-day DAU, trailing {MAU_WINDOW_DAYS}-day MAU, and the DAU/MAU
    stickiness ratio — the engagement headline metric. Same activity-spine
    design as the WAU operator: the fact collapses once to distinct
    (user, day); DAU is a plain per-day distinct count, MAU a bounded
    range join against the spine (each activity row lands in ≤
    {MAU_WINDOW_DAYS} spine days); stickiness is the exact integer
    division. Only days observed in the data appear (no synthetic
    calendar), matching the oracle exactly."""
    events = load_table(spark, sf_dir, "events")
    activity = events.select("user_id", F.to_date("ts").alias("aday")).distinct()
    dau = activity.groupBy(F.col("aday").alias("day")).agg(
        F.countDistinct("user_id").alias("dau")
    )
    spine = activity.select(F.col("aday").alias("day")).distinct()
    mau = (
        spine.join(
            activity,
            (F.col("aday") <= F.col("day"))
            & (F.col("aday") > F.date_sub(F.col("day"), MAU_WINDOW_DAYS)),
        )
        .groupBy("day")
        .agg(F.countDistinct("user_id").alias("mau"))
    )
    return (
        dau.join(mau, "day")
        .select(
            "day",
            "dau",
            "mau",
            (F.col("dau").cast("double") / F.col("mau")).alias("stickiness"),
        )
        .orderBy("day")
    )


_ORACLE_EVENTS_DAU_MAU = f"""
WITH activity AS (
  SELECT DISTINCT user_id, CAST(ts AS DATE) AS aday FROM events
), dau AS (
  SELECT aday AS day, COUNT(DISTINCT user_id) AS dau FROM activity GROUP BY 1
), spine AS (SELECT DISTINCT aday AS day FROM activity),
mau AS (
  SELECT day, COUNT(DISTINCT user_id) AS mau
  FROM spine JOIN activity
    ON aday <= day AND aday > day - {MAU_WINDOW_DAYS}
  GROUP BY day
)
SELECT day, dau, mau, CAST(dau AS DOUBLE) / mau AS stickiness
FROM dau JOIN mau USING (day)
ORDER BY day
"""


# ---------------------------------------------------------------------------
# Seasonal-naive forecast baseline (backtest over the daily aggregate)
# ---------------------------------------------------------------------------

FORECAST_SEASON_DAYS = 7


def q_events_forecast_baseline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonal-naive forecasting baseline with an in-engine backtest:
    forecast(day) = actual(day − {FORECAST_SEASON_DAYS}) for daily event
    counts per type, evaluated over every day that HAS a
    season-earlier observation — the baseline every real forecasting
    model must beat, plus the per-type MAE/bias the evaluation needs.
    Forecasting-at-scale is 99% this shape: aggregate to the grain, lag
    by the season, score — all relational.

    Plan: one additive daily aggregate (the only fact-sized work), then a
    per-type LAG window over the day-ordered daily rows (day gaps break a
    naive LAG-k — the lag is therefore an equi-JOIN on day−{FORECAST_SEASON_DAYS},
    which is gap-proof), then a per-type integer MAE rollup. Counts are
    integers end-to-end; the MAE division is the only float op."""
    events = load_table(spark, sf_dir, "events")
    daily = events.groupBy(
        F.to_date("ts").alias("day"), F.col("event_type")
    ).agg(F.count(F.lit(1)).alias("actual"))
    past = daily.select(
        F.date_add(F.col("day"), FORECAST_SEASON_DAYS).alias("day"),
        F.col("event_type"),
        F.col("actual").alias("forecast"),
    )
    scored = daily.join(past, ["day", "event_type"]).select(
        "event_type",
        "day",
        "actual",
        "forecast",
        F.abs(F.col("actual") - F.col("forecast")).alias("abs_err"),
    )
    return (
        scored.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_days"),
            F.sum("abs_err").alias("total_abs_err"),
            (F.sum("abs_err").cast("double") / F.count(F.lit(1))).alias("mae"),
            F.sum(F.col("actual") - F.col("forecast")).alias("bias"),
        )
        .orderBy("event_type")
    )


_ORACLE_EVENTS_FORECAST_BASELINE = f"""
WITH daily AS (
  SELECT CAST(ts AS DATE) AS day, event_type, COUNT(*) AS actual
  FROM events GROUP BY 1, 2
), scored AS (
  SELECT a.event_type, a.day, a.actual, p.actual AS forecast,
         abs(a.actual - p.actual) AS abs_err
  FROM daily a
  JOIN daily p ON p.day + {FORECAST_SEASON_DAYS} = a.day
              AND p.event_type = a.event_type
)
SELECT event_type,
       COUNT(*) AS n_days,
       CAST(SUM(abs_err) AS BIGINT) AS total_abs_err,
       CAST(SUM(abs_err) AS DOUBLE) / COUNT(*) AS mae,
       CAST(SUM(actual - forecast) AS BIGINT) AS bias
FROM scored
GROUP BY event_type
ORDER BY event_type
"""



FMASE_SEASON = 7  # seasonal-naive lag (days) — matches events_forecast_baseline


def q_forecast_mase_smape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale-free forecast-quality metrics for the seasonal-naive
    baseline: MASE (Hyndman & Koehler 2006 — MAE relative to the
    in-sample one-step naive MAE; < 1 means "beats the naive random
    walk", comparable ACROSS series of different volumes, which raw
    MAE/MAPE are not) and sMAPE (bounded symmetric percentage error),
    per event type. ``events_forecast_baseline`` reports the raw
    MAE/bias; this entry is the normalized rung a forecast LEADERBOARD
    needs to rank models across types.

    Exactness: both MAE sums are exact integers (daily counts); MASE is
    ONE division of two exact rationals. The sMAPE terms 2|f−a|/(f+a)
    are per-row doubles summed with the decimal-quantized ``dsum``
    (each term ≤ 2, scale 12 — partition-order-free). Day gaps can't
    corrupt either lag: both the seasonal and the one-step lag are
    gap-proof equi-joins on day arithmetic, not LAG windows.

    Scale shape: one additive daily aggregate (the only fact-sized
    work), two self-joins + one rollup on the days×types frame."""
    events = load_table(spark, sf_dir, "events")
    daily = events.groupBy(F.to_date("ts").alias("day"), F.col("event_type")).agg(
        F.count(F.lit(1)).alias("actual")
    )
    season = daily.select(
        F.date_add(F.col("day"), FMASE_SEASON).alias("day"),
        "event_type",
        F.col("actual").alias("forecast"),
    )
    one_step = daily.select(
        F.date_add(F.col("day"), 1).alias("day"),
        "event_type",
        F.col("actual").alias("prev"),
    )
    fa = F.col("forecast").cast("double") + F.col("actual").cast("double")
    smape_term = (
        F.lit(2.0)
        * F.abs(F.col("actual") - F.col("forecast")).cast("double")
        / fa
    )
    scored = daily.join(season, ["day", "event_type"]).select(
        "event_type",
        F.abs(F.col("actual") - F.col("forecast")).alias("abs_err"),
        smape_term.alias("smape_term"),
    )
    num = scored.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_eval_days"),
        F.sum("abs_err").cast("long").alias("sum_abs_err"),
        dsum(F.col("smape_term"), scale=12).alias("smape_sum"),
    )
    den = (
        daily.join(one_step, ["day", "event_type"])
        .select("event_type", F.abs(F.col("actual") - F.col("prev")).alias("d1"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_insample"),
            F.sum("d1").cast("long").alias("sum_d1"),
        )
    )
    mase = (
        F.col("sum_abs_err").cast("double") / F.col("n_eval_days").cast("double")
    ) / (F.col("sum_d1").cast("double") / F.col("n_insample").cast("double"))
    return (
        num.join(den, "event_type")
        .select(
            "event_type",
            "n_eval_days",
            "sum_abs_err",
            "n_insample",
            "sum_d1",
            mase.alias("mase"),
            (F.col("smape_sum") / F.col("n_eval_days").cast("double")).alias("smape"),
        )
        .orderBy("event_type")
    )


_ORACLE_FORECAST_MASE = f"""
WITH daily AS (
  SELECT CAST(ts AS DATE) AS day, event_type, COUNT(*) AS actual
  FROM events WHERE ts IS NOT NULL
  GROUP BY 1, 2
), scored AS (
  SELECT d.event_type,
         ABS(d.actual - p.actual) AS abs_err,
         2.0 * CAST(ABS(d.actual - p.actual) AS DOUBLE)
           / (CAST(p.actual AS DOUBLE) + CAST(d.actual AS DOUBLE)) AS smape_term
  FROM daily d JOIN daily p
    ON d.event_type = p.event_type AND d.day = p.day + INTERVAL {FMASE_SEASON} DAY
), num AS (
  SELECT event_type, COUNT(*) AS n_eval_days,
         CAST(SUM(abs_err) AS BIGINT) AS sum_abs_err,
         {sql_dsum("smape_term", scale=12)} AS smape_sum
  FROM scored GROUP BY 1
), den AS (
  SELECT d.event_type, COUNT(*) AS n_insample,
         CAST(SUM(ABS(d.actual - p.actual)) AS BIGINT) AS sum_d1
  FROM daily d JOIN daily p
    ON d.event_type = p.event_type AND d.day = p.day + INTERVAL 1 DAY
  GROUP BY 1
)
SELECT n.event_type, n.n_eval_days, n.sum_abs_err, d.n_insample, d.sum_d1,
       (CAST(n.sum_abs_err AS DOUBLE) / CAST(n.n_eval_days AS DOUBLE))
         / (CAST(d.sum_d1 AS DOUBLE) / CAST(d.n_insample AS DOUBLE)) AS mase,
       n.smape_sum / CAST(n.n_eval_days AS DOUBLE) AS smape
FROM num n JOIN den d USING (event_type)
ORDER BY n.event_type
"""


# ---------------------------------------------------------------------------
# Rolling 7-day active users (engagement metric over a bounded range join)
# ---------------------------------------------------------------------------

WAU_WINDOW_DAYS = 7


def q_events_wau_rolling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling {WAU_WINDOW_DAYS}-day active users per calendar day — the
    engagement metric (WAU) every product dashboard carries, and a shape
    windows cannot express (COUNT DISTINCT over a sliding frame is not a
    window aggregate in any engine).

    Plan: collapse the fact to distinct (user, day) FIRST (the only
    fact-sized work — activity rows, not events, flow onward), derive the
    observed-day spine from the SAME aggregate, then a bounded range join
    (day-{WAU_WINDOW_DAYS}, day] — each activity row lands in at most
    {WAU_WINDOW_DAYS} spine days, so the join output is ≤ 7× activity
    rows, never quadratic — and a distinct count per spine day. At 100 TB
    the spine is tiny (one row per day) and broadcasts."""
    events = load_table(spark, sf_dir, "events")
    activity = events.select(
        F.to_date("ts").alias("aday"), "user_id"
    ).distinct()
    spine = activity.select(F.col("aday").alias("day")).distinct()
    return (
        spine.join(
            activity,
            (F.col("aday") <= F.col("day"))
            & (F.col("aday") > F.date_sub(F.col("day"), WAU_WINDOW_DAYS)),
        )
        .groupBy("day")
        .agg(F.countDistinct("user_id").alias("wau"))
        .orderBy("day")
    )


_ORACLE_EVENTS_WAU_ROLLING = f"""
WITH activity AS (
  SELECT DISTINCT CAST(ts AS DATE) AS aday, user_id FROM events
), spine AS (
  SELECT DISTINCT aday AS day FROM activity
)
SELECT day, COUNT(DISTINCT user_id) AS wau
FROM spine JOIN activity
  ON aday <= day AND aday > day - {WAU_WINDOW_DAYS}
GROUP BY day
ORDER BY day
"""


# ---------------------------------------------------------------------------
# Session-scoped conversion funnel (sessionize × ordered-stage funnel)
# ---------------------------------------------------------------------------

def q_events_session_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conversion funnel WITHIN sessions: of all gap-based sessions
    ({SESSION_GAP_MIN}-min inactivity), how many contain a view, a click
    at-or-after that view, and a purchase at-or-after that click — the
    composition of the two certified shapes (sessionize + ordered funnel)
    a product-analytics user actually asks for ("do people convert inside
    one sitting?"), which neither answers alone: the global funnel ignores
    session boundaries, sessionize ignores stage order.

    Plan: ONE shuffle on user_id serves everything — the session-id
    running sum, then three chained whole-partition window MINs on
    (user, session) that resolve the stage ordering (min view time →
    min click ≥ it → min purchase ≥ that; each stage reads the previous
    stage's windowed column; timestamp comparisons are exact). The
    final aggregate collapses per-session flags to four counters plus
    exact-ratio conversion rates. Window/agg keys share the user_id
    prefix, so Catalyst reuses the exchange end-to-end."""
    events = load_table(spark, sf_dir, "events")
    by_user = Window.partitionBy("user_id").orderBy(
        F.col("ts").asc(), F.col("event_id").asc()
    )
    with_gap = events.select(
        "user_id",
        "event_id",
        "ts",
        "event_type",
        F.col("ts").alias("s"),
        (
            F.when(
                F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts").over(by_user))
                > SESSION_GAP_MIN * 60,
                1,
            )
            .otherwise(0)
            + F.when(F.lag("ts").over(by_user).isNull(), 1).otherwise(0)
        ).alias("is_new"),
    )
    sess = with_gap.withColumn(
        "sid",
        F.sum("is_new").over(
            by_user.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    w_sess = Window.partitionBy("user_id", "sid")
    staged = (
        sess.withColumn(
            "mv", F.min(F.when(F.col("event_type") == "view", F.col("s"))).over(w_sess)
        )
        .withColumn(
            "mc",
            F.min(
                F.when(
                    (F.col("event_type") == "click") & (F.col("s") >= F.col("mv")),
                    F.col("s"),
                )
            ).over(w_sess),
        )
        .withColumn(
            "mp",
            F.min(
                F.when(
                    (F.col("event_type") == "purchase") & (F.col("s") >= F.col("mc")),
                    F.col("s"),
                )
            ).over(w_sess),
        )
    )
    per_session = staged.groupBy("user_id", "sid").agg(
        F.max(F.col("mv").isNotNull().cast("int")).alias("has_view"),
        F.max(F.col("mc").isNotNull().cast("int")).alias("has_click"),
        F.max(F.col("mp").isNotNull().cast("int")).alias("has_purchase"),
    )
    return per_session.agg(
        F.count(F.lit(1)).alias("n_sessions"),
        F.sum("has_view").alias("n_view"),
        F.sum("has_click").alias("n_view_click"),
        F.sum("has_purchase").alias("n_view_click_purchase"),
        (F.sum("has_click").cast("double") / F.sum("has_view")).alias(
            "click_rate"
        ),
        (
            F.sum("has_purchase").cast("double") / F.sum("has_click")
        ).alias("purchase_rate"),
    )


_ORACLE_EVENTS_SESSION_FUNNEL = f"""
WITH with_gap AS (
  SELECT user_id, event_id, ts, event_type, CAST(ts AS TIMESTAMP) AS s,
         CASE WHEN lag(ts) OVER w IS NULL THEN 1
              WHEN floor(epoch(CAST(ts AS TIMESTAMP)))
                   - floor(epoch(CAST(lag(ts) OVER w AS TIMESTAMP)))
                   > {SESSION_GAP_MIN} * 60 THEN 1
              ELSE 0 END AS is_new
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
), sess AS (
  SELECT *, SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
                              ROWS UNBOUNDED PRECEDING) AS sid
  FROM with_gap
), s1 AS (
  SELECT *, MIN(CASE WHEN event_type = 'view' THEN s END)
              OVER (PARTITION BY user_id, sid) AS mv
  FROM sess
), s2 AS (
  SELECT *, MIN(CASE WHEN event_type = 'click' AND s >= mv THEN s END)
              OVER (PARTITION BY user_id, sid) AS mc
  FROM s1
), s3 AS (
  SELECT *, MIN(CASE WHEN event_type = 'purchase' AND s >= mc THEN s END)
              OVER (PARTITION BY user_id, sid) AS mp
  FROM s2
), per_session AS (
  SELECT user_id, sid,
         MAX(CASE WHEN mv IS NOT NULL THEN 1 ELSE 0 END) AS has_view,
         MAX(CASE WHEN mc IS NOT NULL THEN 1 ELSE 0 END) AS has_click,
         MAX(CASE WHEN mp IS NOT NULL THEN 1 ELSE 0 END) AS has_purchase
  FROM s3 GROUP BY user_id, sid
)
SELECT COUNT(*) AS n_sessions,
       CAST(SUM(has_view) AS BIGINT) AS n_view,
       CAST(SUM(has_click) AS BIGINT) AS n_view_click,
       CAST(SUM(has_purchase) AS BIGINT) AS n_view_click_purchase,
       CAST(SUM(has_click) AS DOUBLE) / SUM(has_view) AS click_rate,
       CAST(SUM(has_purchase) AS DOUBLE) / SUM(has_click) AS purchase_rate
FROM per_session
"""


# ---------------------------------------------------------------------------
# Multi-touch LINEAR attribution (interval join + fractional credit)
# ---------------------------------------------------------------------------

LINEAR_LOOKBACK_HOURS = 6


def q_events_attribution_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-touch linear attribution: each purchase's value is split
    EQUALLY across every touchpoint (view/click) by the same user in the
    {LINEAR_LOOKBACK_HOURS}-hour window before it; purchases with no
    in-window touch credit 'direct' in full. The complement of the
    last-touch operator: an interval join with fractional credit instead
    of an IGNORE-NULLS carry-forward.

    Plan: purchases ⋈ touches on user_id with the time-range predicate
    riding on the join (one shuffle on user_id; per-pair cost bounded by
    per-user activity inside the lookback — the standard interval-join
    bound; at 100 TB add time-bucket keys to cap the per-task pair
    count). The per-purchase touch count is a window COUNT over the pair
    list partitioned by purchase id — it reuses rows already materialized
    by the join, no second aggregation pass. 'Direct' purchases fall out
    of a LEFT ANTI join against the credited purchase ids. Credit
    value/n is the identical IEEE division on both engines; sums are
    decimal-quantized.

    Strictly-before is tie-broken by the unique event_id so a purchase
    and touch sharing one timestamp order identically everywhere."""
    events = load_table(spark, sf_dir, "events")
    purch = events.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("event_id").alias("p_id"),
        F.col("ts").alias("p_ts"),
        "value",
    )
    touch = events.filter(F.col("event_type").isin(*ATTR_TOUCH_TYPES)).select(
        F.col("user_id").alias("t_user"),
        F.col("event_id").alias("t_id"),
        F.col("ts").alias("t_ts"),
        F.col("event_type").alias("channel"),
    )
    before = (F.col("t_ts") < F.col("p_ts")) | (
        (F.col("t_ts") == F.col("p_ts")) & (F.col("t_id") < F.col("p_id"))
    )
    pairs = purch.join(
        touch,
        (F.col("user_id") == F.col("t_user"))
        & before
        & (
            F.col("t_ts")
            >= F.col("p_ts") - F.expr(f"INTERVAL {LINEAR_LOOKBACK_HOURS} HOURS")
        ),
    )
    n = F.count(F.lit(1)).over(Window.partitionBy("p_id"))
    credited = (
        pairs.withColumn("credit", F.col("value") / n)
        .groupBy("channel")
        .agg(
            F.count(F.lit(1)).alias("n_credits"),
            dsum("credit", scale=8).alias("attributed_value"),
        )
    )
    direct = (
        purch.join(pairs.select("p_id").distinct(), "p_id", "left_anti")
        .agg(
            F.count(F.lit(1)).alias("n_credits"),
            dsum("value", scale=8).alias("attributed_value"),
        )
        .select(F.lit("direct").alias("channel"), "n_credits", "attributed_value")
    )
    return credited.unionByName(direct).orderBy("channel")


_ORACLE_EVENTS_ATTRIBUTION_LINEAR = f"""
WITH purch AS (
  SELECT user_id, event_id AS p_id, CAST(ts AS TIMESTAMP) AS p_ts, value
  FROM events WHERE event_type = 'purchase'
), touch AS (
  SELECT user_id AS t_user, event_id AS t_id, CAST(ts AS TIMESTAMP) AS t_ts,
         event_type AS channel
  FROM events WHERE event_type IN ('view', 'click')
), pairs AS (
  SELECT p_id, channel, value,
         COUNT(*) OVER (PARTITION BY p_id) AS n
  FROM purch JOIN touch
    ON user_id = t_user
   AND (t_ts < p_ts OR (t_ts = p_ts AND t_id < p_id))
   AND t_ts >= p_ts - INTERVAL {LINEAR_LOOKBACK_HOURS} HOUR
), credited AS (
  SELECT channel, COUNT(*) AS n_credits,
         {sql_dsum("value / n", scale=8)} AS attributed_value
  FROM pairs GROUP BY channel
), direct AS (
  SELECT 'direct' AS channel, COUNT(*) AS n_credits,
         {sql_dsum("value", scale=8)} AS attributed_value
  FROM purch WHERE p_id NOT IN (SELECT p_id FROM pairs)
)
SELECT * FROM credited UNION ALL SELECT * FROM direct ORDER BY channel
"""


# ---------------------------------------------------------------------------
# Per-key exponential moving average (sequential recurrence as a fold)
# ---------------------------------------------------------------------------

EWMA_ALPHA = 0.25  # exactly representable in binary → deterministic arithmetic
# Per-key histories are folded in bounded chunks of this many events; one
# task never holds more than EWMA_CHUNK values for a key, however hot the
# key is. 4096 doubles ≈ 32 KiB per in-flight chunk array.
EWMA_CHUNK = 4096


def q_events_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user EWMA of event values — a SEQUENTIAL recurrence
    (ewma_i = ewma_{i-1} + α·(x_i − ewma_{i-1}), seeded with the first
    value), the class of computation windows can't express (each step
    depends on the previous OUTPUT, not a frame of inputs).

    Hot-key-safe TWO-LEVEL fold. The EWMA step is affine in the
    accumulator (acc' = acc·(1−α) + α·x), and affine maps compose, so a
    chunk of C events collapses to the pair (w, b) with
    w = Π(1−α) = (1−α)^C (folded by repeated multiply) and
    b folded as b' = b·(1−α) + α·x from 0 — applying the chunk is then
    ``acc·w + b``. Level 1 folds each bounded chunk (≤ EWMA_CHUNK events,
    chunk id from a per-key row_number); level 2 composes the ≤ n/C chunk
    summaries in chunk order. No task ever materializes a key's full
    history: the worst key holds EWMA_CHUNK values per chunk row plus one
    16-byte summary per chunk. The head chunk keeps the seed semantics
    (NULL-seeded fold of the ORIGINAL expression acc + α·(x − acc)), so
    any key with ≤ EWMA_CHUNK events — every key in the test data — gets
    the exact same operation sequence as the plain single-level fold:
    results are bit-identical to it there, and within O(ε·n) of exact
    arithmetic in general.

    Determinism: both engines evaluate the SAME fold expressions over the
    SAME sequences (sort_array / array_agg ORDER BY on (ts, event_id),
    chunking by the same row_number), and IEEE-754 double arithmetic is
    deterministic given identical operation order, so the result is
    bit-identical cross-engine with no decimal quantization needed.

    Scale shape: one window pass for the per-key sequence number
    (sort-based, disk-spillable) + two hash-agg shuffles, all keyed by
    user; per-task state is bounded by EWMA_CHUNK regardless of key skew.
    The streaming stateful twin (streaming/events.streaming_ewma, under
    the exact gate as streaming_ewma_replay) is the answer for unbounded
    ARRIVAL; this bounds per-task MEMORY."""
    events = load_table(spark, sf_dir, "events").filter(
        F.col("ts").isNotNull() & F.col("value").isNotNull()
    )
    seq_w = Window.partitionBy("user_id").orderBy(
        F.col("ts").asc(), F.col("event_id").asc()
    )
    seq0 = F.row_number().over(seq_w) - F.lit(1)
    chunked = events.select(
        "user_id",
        "value",
        (seq0 / F.lit(EWMA_CHUNK)).cast("bigint").alias("chunk"),
        # Within-chunk ordinal: orders the chunk's values without carrying
        # (ts, event_id) into the collected structs — the sort key shrinks
        # from (timestamp, long) to one int and the array stays narrow.
        (seq0 % F.lit(EWMA_CHUNK)).cast("int").alias("lseq"),
    )
    one_m_a = F.lit(1.0 - EWMA_ALPHA)
    per_chunk = chunked.groupBy("user_id", "chunk").agg(
        F.count(F.lit(1)).alias("n"),
        F.transform(
            F.sort_array(F.collect_list(F.struct("lseq", "value"))),
            lambda s: s["value"],
        ).alias("_vals"),
    )
    head_fold = F.aggregate(
        F.col("_vals"),
        F.lit(None).cast("double"),
        lambda acc, x: F.when(acc.isNull(), x).otherwise(
            acc + F.lit(EWMA_ALPHA) * (x - acc)
        ),
    )
    w_fold = F.aggregate(F.col("_vals"), F.lit(1.0), lambda acc, x: acc * one_m_a)
    b_fold = F.aggregate(
        F.col("_vals"),
        F.lit(0.0),
        lambda acc, x: acc * one_m_a + F.lit(EWMA_ALPHA) * x,
    )
    # Fold economics: the compose step reads v for chunk 0 and (w, b) for
    # later chunks ONLY, so each side is gated on the chunk id — a
    # single-chunk key (every key until ~EWMA_CHUNK events) folds its
    # array ONCE, not three times. Output-invariant: the ungated values
    # were never referenced.
    summaries = per_chunk.select(
        "user_id",
        "n",
        F.struct(
            F.col("chunk"),
            F.when(F.col("chunk") == 0, head_fold).alias("v"),
            F.when(F.col("chunk") > 0, w_fold).alias("w"),
            F.when(F.col("chunk") > 0, b_fold).alias("b"),
        ).alias("_summary"),
    )
    compose = F.aggregate(
        F.sort_array(F.collect_list("_summary")),
        F.lit(None).cast("double"),
        lambda acc, c: F.when(c["chunk"] == 0, c["v"]).otherwise(
            acc * c["w"] + c["b"]
        ),
    )
    return summaries.groupBy("user_id").agg(
        F.sum("n").alias("n_events"), compose.alias("ewma_last")
    )


_ORACLE_EVENTS_EWMA = f"""
WITH e AS (
  SELECT user_id, value,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY CAST(ts AS TIMESTAMP), event_id) - 1 AS seq
  FROM events
  WHERE ts IS NOT NULL AND value IS NOT NULL
), per_chunk AS (
  SELECT user_id, seq // {EWMA_CHUNK} AS chunk, COUNT(*) AS n,
         array_agg(value ORDER BY seq) AS vals
  FROM e
  GROUP BY user_id, seq // {EWMA_CHUNK}
), summaries AS (
  SELECT user_id, chunk, n,
         CASE WHEN chunk = 0 THEN
           list_reduce(vals, (acc, x) -> acc + {EWMA_ALPHA} * (x - acc))
         END AS v,
         list_reduce(list_prepend(CAST(1.0 AS DOUBLE), vals),
                     (acc, x) -> acc * {1.0 - EWMA_ALPHA}) AS w,
         list_reduce(list_prepend(CAST(0.0 AS DOUBLE), vals),
                     (acc, x) -> acc * {1.0 - EWMA_ALPHA} + {EWMA_ALPHA} * x) AS b
  FROM per_chunk
), composed AS (
  -- list_reduce seeds with the head element (the chunk-0 summary after
  -- list_sort) and the lambda keeps the running EWMA in field v, so the
  -- value-path arithmetic (v·w + b per later chunk) matches the Spark
  -- fold operation-for-operation.
  SELECT user_id, CAST(SUM(n) AS BIGINT) AS n_events,
         list_reduce(
           list_sort(array_agg({{'chunk': chunk, 'v': v, 'w': w, 'b': b}})),
           (acc, c) -> {{'chunk': c.chunk, 'v': acc.v * c.w + c.b,
                         'w': c.w, 'b': c.b}}
         ).v AS ewma_last
  FROM summaries
  GROUP BY user_id
)
SELECT user_id, n_events, ewma_last FROM composed
"""


# ---------------------------------------------------------------------------
# Time-weighted average (irregular-sample downsampling)
# ---------------------------------------------------------------------------


def q_events_twap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user TIME-weighted average of the value series — the standard
    resampler for irregularly-spaced observations (TWAP in finance,
    duty-cycle averaging in telemetry): each value is weighted by how long
    it remained current, twap = Σ(vᵢ·dtᵢ) / Σ(dtᵢ) where dtᵢ spans
    observation i to i+1 (the final observation has no duration and drops
    out). A plain AVG over-weights burst periods; the time weighting is
    what a resample-then-average would converge to.

    Determinism: durations are INTEGER epoch seconds (floor on both
    engines); each product vᵢ·dtᵢ is one IEEE multiply (order-free), the
    numerator is the decimal-quantized ``dsum`` (order-free), the
    denominator an integer sum — so the final double division is
    bit-identical everywhere. Seconds, not micros, keep Σ(v·dt)·10^scale
    within the 2^53 exact-double bound (see functions/exact.dsum).

    Scale shape: one keyed window (lead) over the user partitioning and
    one hash-agg — the same single-shuffle shape as sessionization; at
    100 TB both reuse one (user_id) exchange. Unlike a collect_list
    fold, the window is SORT-based (ExternalSorter, disk-spillable): a
    hot key costs spill I/O, never unbounded task memory — no chunking
    needed here."""
    events = load_table(spark, sf_dir, "events").filter(
        F.col("ts").isNotNull() & F.col("value").isNotNull()
    )
    # the window orders by the truncated seconds (with event_id tiebreak),
    # NOT raw ts — both engines must pair identical (current, next) rows,
    # and sub-second ts differences collapse under the seconds floor
    w = Window.partitionBy("user_id").orderBy(F.col("s").asc(), F.col("event_id").asc())
    seg = (
        events.select(
            "user_id",
            "event_id",
            "value",
            F.unix_timestamp(F.col("ts").cast("timestamp")).alias("s"),
        )
        .withColumn("next_s", F.lead("s").over(w))
        .filter(F.col("next_s").isNotNull())
        .select("user_id", "value", (F.col("next_s") - F.col("s")).alias("dt_s"))
    )
    return seg.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_intervals"),
        F.sum("dt_s").alias("total_s"),
        (
            dsum(F.col("value") * F.col("dt_s"), scale=6)
            / F.nullif(F.sum("dt_s"), F.lit(0)).cast("double")
        ).alias("twap"),
    )


_ORACLE_EVENTS_TWAP = f"""
WITH e AS (
  SELECT user_id, event_id, value,
         CAST(floor(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT) AS s
  FROM events WHERE ts IS NOT NULL AND value IS NOT NULL
), seg AS (
  SELECT user_id, value,
         lead(s) OVER (PARTITION BY user_id ORDER BY s, event_id) - s AS dt_s
  FROM e
)
SELECT user_id,
       COUNT(*) AS n_intervals,
       CAST(SUM(dt_s) AS BIGINT) AS total_s,
       {sql_dsum("value * dt_s", scale=6)}
         / CAST(nullif(SUM(dt_s), 0) AS DOUBLE) AS twap
FROM seg WHERE dt_s IS NOT NULL
GROUP BY user_id
"""


# ---------------------------------------------------------------------------
# Seasonal strength (Hyndman F_s) per event type
# ---------------------------------------------------------------------------


def q_events_seasonal_strength(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonal-strength diagnostic F_s = max(0, 1 − Var(remainder)/
    Var(detrended)) per event type (Hyndman & Athanasopoulos, FPP —
    the "is this series worth a seasonal model?" scalar a forecasting
    platform computes before choosing between ``events_forecast_baseline``
    and a non-seasonal fit). Trend = per-(type, day) mean; seasonal =
    per-(type, hour) mean of the detrended series (exactly
    ``events_seasonal_hourly``'s decomposition); remainder = detrended −
    seasonal.

    Exactness: both variances come from exact decimal moment sums over
    deterministic per-row doubles (each row's detrended/remainder value
    is a fixed IEEE op chain on exact aggregates); F_s is rational ops +
    one max-with-0 comparison.

    Scale shape: the same two map-side hash aggs + broadcast joins as the
    decomposition, plus ONE per-type moment aggregate — nothing beyond
    aggregate-sized frames after the scan."""
    events = load_table(spark, sf_dir, "events")
    base = events.select(
        "event_type",
        F.date_trunc("day", F.col("ts")).alias("day"),
        F.hour("ts").alias("hour"),
        "value",
    )
    per_day = base.groupBy("event_type", "day").agg(
        F.count(F.lit(1)).alias("n_d"), dsum("value", scale=8).alias("s_d")
    )
    detrended = base.join(F.broadcast(per_day), ["event_type", "day"]).select(
        "event_type",
        "hour",
        (F.col("value") - F.col("s_d") / F.col("n_d").cast("double")).alias("resid"),
    )
    per_hour = detrended.groupBy("event_type", "hour").agg(
        F.count(F.lit(1)).alias("n_c"), dsum("resid", scale=8).alias("s_r")
    )
    remaindered = detrended.join(F.broadcast(per_hour), ["event_type", "hour"]).select(
        "event_type",
        "resid",
        (F.col("resid") - F.col("s_r") / F.col("n_c").cast("double")).alias("rem"),
    )
    m = remaindered.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        dsum("resid", scale=8).alias("sx"),
        dsum(F.col("resid") * F.col("resid"), scale=6, precision=38).alias("sxx"),
        dsum("rem", scale=8).alias("sy"),
        dsum(F.col("rem") * F.col("rem"), scale=6, precision=38).alias("syy"),
    )
    n = F.col("n").cast("double")
    var_detr = (n * F.col("sxx") - F.col("sx") * F.col("sx")) / (n * n)
    var_rem = (n * F.col("syy") - F.col("sy") * F.col("sy")) / (n * n)
    fs = F.greatest(F.lit(0.0), F.lit(1.0) - var_rem / var_detr)
    return m.select(
        "event_type",
        F.col("n").cast("long").alias("n"),
        var_detr.alias("var_detrended"),
        var_rem.alias("var_remainder"),
        fs.alias("seasonal_strength"),
    ).orderBy("event_type")


_ORACLE_SEASONAL_STRENGTH = f"""
WITH base AS (
  SELECT event_type, date_trunc('day', CAST(ts AS TIMESTAMP)) AS day,
         EXTRACT(hour FROM CAST(ts AS TIMESTAMP)) AS hour, value
  FROM events
), per_day AS (
  SELECT event_type, day, COUNT(*) AS n_d, {sql_dsum("value", scale=8)} AS s_d
  FROM base GROUP BY event_type, day
), detrended AS (
  SELECT b.event_type, b.hour,
         b.value - (d.s_d / CAST(d.n_d AS DOUBLE)) AS resid
  FROM base b JOIN per_day d USING (event_type, day)
), per_hour AS (
  SELECT event_type, hour, COUNT(*) AS n_c, {sql_dsum("resid", scale=8)} AS s_r
  FROM detrended GROUP BY event_type, hour
), remaindered AS (
  SELECT t.event_type, t.resid,
         t.resid - (h.s_r / CAST(h.n_c AS DOUBLE)) AS rem
  FROM detrended t JOIN per_hour h USING (event_type, hour)
), m AS (
  SELECT event_type, COUNT(*) AS n,
         {sql_dsum("resid", scale=8)} AS sx,
         {sql_dsum("resid * resid", scale=6, precision=38)} AS sxx,
         {sql_dsum("rem", scale=8)} AS sy,
         {sql_dsum("rem * rem", scale=6, precision=38)} AS syy
  FROM remaindered GROUP BY event_type
)
SELECT event_type, CAST(n AS BIGINT) AS n,
       (CAST(n AS DOUBLE) * sxx - sx * sx) / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)) AS var_detrended,
       (CAST(n AS DOUBLE) * syy - sy * sy) / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)) AS var_remainder,
       GREATEST(0.0, 1.0 - ((CAST(n AS DOUBLE) * syy - sy * sy)
                              / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)))
                        / ((CAST(n AS DOUBLE) * sxx - sx * sx)
                              / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)))) AS seasonal_strength
FROM m
ORDER BY event_type
"""


# ---------------------------------------------------------------------------
# CUSUM changepoint detection per event type
# ---------------------------------------------------------------------------


def q_events_cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Offline CUSUM changepoint per event type: the point that maximizes
    |Σ_{j≤i}(x_j − μ)| over the (ts, event_id)-ordered series — the
    classic single-changepoint location statistic (a mean shift at i
    makes the centered prefix sum peak exactly there).

    Exactness: the prefix sum is a cumulative DECIMAL window sum (exact,
    order-pinned by the unique (ts, event_id) key); cusum_i = prefix_i −
    i·μ is two IEEE ops on deterministic inputs, and the argmax picks by
    (|cusum| desc, ts, event_id) — a total order, so the reported
    changepoint is unique and bit-stable.

    Scale shape: the window is PARTITIONED BY event_type — per-key
    sequential semantics, the inherent shape of changepoint detection;
    cost is one type-keyed shuffle and the per-type sort. The argmax is a
    rank-1 filter on the same partitioning (exchange reuse), and output
    is |types| rows."""
    events = load_table(spark, sf_dir, "events")
    g = events.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"), dsum("value", scale=8).alias("s")
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    prefixed = events.join(F.broadcast(g), "event_type").select(
        "event_type",
        "ts",
        "event_id",
        F.sum(F.col("value").cast("decimal(28,8)")).over(w).cast("double").alias("prefix"),
        F.row_number()
        .over(Window.partitionBy("event_type").orderBy("ts", "event_id"))
        .alias("i"),
        (F.col("s") / F.col("n").cast("double")).alias("mu"),
        "n",
    )
    cusum = prefixed.select(
        "event_type",
        "ts",
        "n",
        "i",
        F.abs(F.col("prefix") - F.col("i").cast("double") * F.col("mu")).alias("abs_cusum"),
    )
    r = F.row_number().over(
        Window.partitionBy("event_type").orderBy(
            F.col("abs_cusum").desc(), F.col("ts").asc(), F.col("i").asc()
        )
    )
    return (
        cusum.select("event_type", "ts", "n", "i", "abs_cusum", r.alias("r"))
        .filter(F.col("r") == 1)
        .select(
            "event_type",
            F.col("n").cast("long").alias("n"),
            F.col("i").cast("long").alias("cp_index"),
            F.col("ts").alias("cp_ts"),
            F.col("abs_cusum").alias("max_abs_cusum"),
        )
        .orderBy("event_type")
    )


_ORACLE_CUSUM = f"""
WITH g AS (
  SELECT event_type, COUNT(*) AS n, {sql_dsum("value", scale=8)} AS s
  FROM events GROUP BY event_type
), prefixed AS (
  SELECT e.event_type, CAST(e.ts AS TIMESTAMP) AS ts, g.n,
         CAST(SUM(CAST(e.value AS DECIMAL(28,8)))
              OVER (PARTITION BY e.event_type ORDER BY e.ts, e.event_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS prefix,
         ROW_NUMBER() OVER (PARTITION BY e.event_type ORDER BY e.ts, e.event_id) AS i,
         s / CAST(g.n AS DOUBLE) AS mu
  FROM events e JOIN g USING (event_type)
), cusum AS (
  SELECT event_type, ts, n, i,
         ABS(prefix - CAST(i AS DOUBLE) * mu) AS abs_cusum
  FROM prefixed
), ranked AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY event_type
                               ORDER BY abs_cusum DESC, ts ASC, i ASC) AS r
  FROM cusum
)
SELECT event_type, CAST(n AS BIGINT) AS n, CAST(i AS BIGINT) AS cp_index,
       ts AS cp_ts, abs_cusum AS max_abs_cusum
FROM ranked WHERE r = 1
ORDER BY event_type
"""


# ---------------------------------------------------------------------------
# Detrended hourly seasonal decomposition per event type
# ---------------------------------------------------------------------------


def q_events_seasonal_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hour-of-day seasonal profile per event type, DETRENDED the way a
    classical decomposition does it: subtract each (type, day)'s mean
    (the trend estimate) from every observation, then average the
    residuals by (type, hour) — the seasonal offset a forecaster adds
    back on top of the daily trend. Also reports the raw hourly mean and
    the multiplicative seasonal index vs the type mean.

    Exactness: all three layers (day means, hour aggregates, type means)
    are exact decimal sums; offsets/indexes are fixed-order IEEE ops.

    Scale shape: two map-side-combinable hash aggs ((type,day) then
    (type,hour)) plus a broadcast join of the aggregate-sized day-mean
    frame back onto the stream — no row-proportional state anywhere."""
    events = load_table(spark, sf_dir, "events")
    base = events.select(
        "event_type",
        F.date_trunc("day", F.col("ts")).alias("day"),
        F.hour("ts").alias("hour"),
        "value",
    )
    per_day = base.groupBy("event_type", "day").agg(
        F.count(F.lit(1)).alias("n_d"), dsum("value", scale=8).alias("s_d")
    )
    g = base.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_t"), dsum("value", scale=8).alias("s_t")
    )
    detrended = base.join(F.broadcast(per_day), ["event_type", "day"]).select(
        "event_type",
        "hour",
        "value",
        (F.col("value") - F.col("s_d") / F.col("n_d").cast("double")).alias("resid"),
    )
    per_hour = detrended.groupBy("event_type", "hour").agg(
        F.count(F.lit(1)).alias("n_c"),
        dsum("value", scale=8).alias("s_c"),
        dsum("resid", scale=8).alias("s_r"),
    )
    return (
        per_hour.join(F.broadcast(g), "event_type")
        .select(
            "event_type",
            "hour",
            F.col("n_c").cast("long").alias("n_c"),
            (F.col("s_c") / F.col("n_c").cast("double")).alias("hour_mean"),
            (F.col("s_r") / F.col("n_c").cast("double")).alias("seasonal_offset"),
            (
                (F.col("s_c") / F.col("n_c").cast("double"))
                / (F.col("s_t") / F.col("n_t").cast("double"))
            ).alias("seasonal_index"),
        )
        .orderBy("event_type", "hour")
    )


_ORACLE_SEASONAL = f"""
WITH base AS (
  SELECT event_type, date_trunc('day', CAST(ts AS TIMESTAMP)) AS day,
         EXTRACT(hour FROM CAST(ts AS TIMESTAMP)) AS hour, value
  FROM events
), per_day AS (
  SELECT event_type, day, COUNT(*) AS n_d, {sql_dsum("value", scale=8)} AS s_d
  FROM base GROUP BY event_type, day
), g AS (
  SELECT event_type, COUNT(*) AS n_t, {sql_dsum("value", scale=8)} AS s_t
  FROM base GROUP BY event_type
), detrended AS (
  SELECT b.event_type, b.hour, b.value,
         b.value - (d.s_d / CAST(d.n_d AS DOUBLE)) AS resid
  FROM base b JOIN per_day d USING (event_type, day)
), per_hour AS (
  SELECT event_type, hour, COUNT(*) AS n_c,
         {sql_dsum("value", scale=8)} AS s_c,
         {sql_dsum("resid", scale=8)} AS s_r
  FROM detrended GROUP BY event_type, hour
)
SELECT h.event_type, CAST(h.hour AS INT) AS hour, CAST(h.n_c AS BIGINT) AS n_c,
       h.s_c / CAST(h.n_c AS DOUBLE) AS hour_mean,
       h.s_r / CAST(h.n_c AS DOUBLE) AS seasonal_offset,
       (h.s_c / CAST(h.n_c AS DOUBLE)) / (g.s_t / CAST(g.n_t AS DOUBLE)) AS seasonal_index
FROM per_hour h JOIN g USING (event_type)
ORDER BY event_type, hour
"""


# ---------------------------------------------------------------------------
# Funnel with exclusion event (MATCH_RECOGNIZE-style kill pattern)
# ---------------------------------------------------------------------------


def q_events_funnel_exclusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered view→click→purchase funnel where an intervening ``error``
    KILLS the sequence — the SQL MATCH_RECOGNIZE pattern
    ``V (NOT E)* C (NOT E)* P`` rendered relationally (Spark has no
    MATCH_RECOGNIZE; this is the standard rewrite): per user, t_view =
    first view; t_err = first error after t_view; the click must land in
    (t_view, t_err), and the purchase after the click but still before
    t_err. Plain funnels (``events_funnel``, ``events_session_funnel``)
    count any ordered occurrence — the exclusion variant is what fraud /
    reliability analyses actually ask ("did the user convert WITHOUT
    hitting an error?").

    Exactness: pure timestamp MINs under conditions — data values only,
    no arithmetic. Scale shape: one user_id-keyed conditional aggregate
    per stage (three total), each map-side combinable, chained by
    broadcast-friendly joins on the per-user frame; the result is a
    1-row global rollup."""
    events = load_table(spark, sf_dir, "events").select("user_id", "event_type", "ts")
    tv = events.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "view", F.col("ts"))).alias("t_view")
    )
    s1 = events.join(tv, "user_id")
    stage2 = s1.groupBy("user_id").agg(
        F.max("t_view").alias("t_view"),
        F.min(
            F.when(
                (F.col("event_type") == "error") & (F.col("ts") > F.col("t_view")),
                F.col("ts"),
            )
        ).alias("t_err"),
    )
    s2 = events.join(stage2, "user_id")
    stage3 = s2.groupBy("user_id").agg(
        F.max("t_view").alias("t_view"),
        F.max("t_err").alias("t_err"),
        F.min(
            F.when(
                (F.col("event_type") == "click")
                & (F.col("ts") > F.col("t_view"))
                & ((F.col("t_err").isNull()) | (F.col("ts") < F.col("t_err"))),
                F.col("ts"),
            )
        ).alias("t_click"),
    )
    s3 = events.join(stage3, "user_id")
    per_user = s3.groupBy("user_id").agg(
        F.max("t_view").alias("t_view"),
        F.max("t_err").alias("t_err"),
        F.max("t_click").alias("t_click"),
        F.min(
            F.when(
                (F.col("event_type") == "purchase")
                & (F.col("ts") > F.col("t_click"))
                & ((F.col("t_err").isNull()) | (F.col("ts") < F.col("t_err"))),
                F.col("ts"),
            )
        ).alias("t_purchase"),
    )
    return per_user.agg(
        F.count(F.lit(1)).cast("long").alias("n_users"),
        F.sum(F.when(F.col("t_view").isNotNull(), 1).otherwise(0))
        .cast("long")
        .alias("n_viewed"),
        F.sum(F.when(F.col("t_click").isNotNull(), 1).otherwise(0))
        .cast("long")
        .alias("n_clean_click"),
        F.sum(F.when(F.col("t_purchase").isNotNull(), 1).otherwise(0))
        .cast("long")
        .alias("n_clean_purchase"),
        F.sum(
            F.when(
                F.col("t_err").isNotNull() & F.col("t_purchase").isNull(), 1
            ).otherwise(0)
        )
        .cast("long")
        .alias("n_killed_by_error"),
    )


_ORACLE_FUNNEL_EXCLUSION = """
WITH tv AS (
  SELECT user_id,
         MIN(CASE WHEN event_type = 'view' THEN CAST(ts AS TIMESTAMP) END) AS t_view
  FROM events GROUP BY user_id
), s2 AS (
  SELECT e.user_id, MAX(t.t_view) AS t_view,
         MIN(CASE WHEN e.event_type = 'error'
                   AND CAST(e.ts AS TIMESTAMP) > t.t_view
                  THEN CAST(e.ts AS TIMESTAMP) END) AS t_err
  FROM events e JOIN tv t USING (user_id) GROUP BY e.user_id
), s3 AS (
  SELECT e.user_id, MAX(s.t_view) AS t_view, MAX(s.t_err) AS t_err,
         MIN(CASE WHEN e.event_type = 'click'
                   AND CAST(e.ts AS TIMESTAMP) > s.t_view
                   AND (s.t_err IS NULL OR CAST(e.ts AS TIMESTAMP) < s.t_err)
                  THEN CAST(e.ts AS TIMESTAMP) END) AS t_click
  FROM events e JOIN s2 s USING (user_id) GROUP BY e.user_id
), per_user AS (
  SELECT e.user_id, MAX(s.t_view) AS t_view, MAX(s.t_err) AS t_err,
         MAX(s.t_click) AS t_click,
         MIN(CASE WHEN e.event_type = 'purchase'
                   AND CAST(e.ts AS TIMESTAMP) > s.t_click
                   AND (s.t_err IS NULL OR CAST(e.ts AS TIMESTAMP) < s.t_err)
                  THEN CAST(e.ts AS TIMESTAMP) END) AS t_purchase
  FROM events e JOIN s3 s USING (user_id) GROUP BY e.user_id
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_users,
       CAST(SUM(CASE WHEN t_view IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_viewed,
       CAST(SUM(CASE WHEN t_click IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_clean_click,
       CAST(SUM(CASE WHEN t_purchase IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_clean_purchase,
       CAST(SUM(CASE WHEN t_err IS NOT NULL AND t_purchase IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_killed_by_error
FROM per_user
"""


# ---------------------------------------------------------------------------
# LTTB downsampling (largest-triangle-three-buckets) per event type
# ---------------------------------------------------------------------------

LTTB_B = 12  # output points per series (first + last + 10 middle buckets)


def q_events_lttb_downsample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LTTB (largest-triangle-three-buckets, Steinarsson 2013) series
    downsampling per event type — the dashboard-rendering operator
    Grafana-class frontends run before plotting: keep first and last
    points, split the middle into equal-count buckets, and from each
    bucket keep the point forming the LARGEST triangle with the
    previously kept point and the NEXT bucket's centroid — preserving
    visual extremes a naive stride-sample flattens.

    Determinism: all geometry is INTEGER — x is seconds from the series
    start, y is value·10⁶ fixed-point, and the triangle comparison is
    multiplied through by the next bucket's count so the centroid never
    becomes a float (|(xp·c − Σx)(yc − yp) − (xp − xc)(Σy − yp·c)|,
    magnitudes ≤ ~10¹⁷ < 2⁶³). Selection ties break on earliest ts, so
    both engines pick identical points — the gate compares raw data
    values, untouched by any arithmetic.

    Shapes: Spark side is per-key ``applyInPandas`` (the selection chain
    is sequential in the kept point — same justification as
    ``events_holt_linear``); the ORACLE is the selection unrolled into
    {LTTB_B}−2 declarative stages (the MMR pattern) — two independent
    formulations, one integer geometry. Bucket k (0-based, middle ranks
    r∈[2, n−1]) = ((r−2)·(B−2)) DIV (n−2); requires n ≥ B per series
    (testdata satisfies this at every SF)."""
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("event_type", T.StringType()),
            T.StructField("keep_idx", T.IntegerType()),
            T.StructField("ts", T.TimestampType()),
            T.StructField("value", T.DoubleType()),
        ]
    )
    B = LTTB_B

    def lttb(pdf):
        import pandas as pd

        pdf = pdf.sort_values(["ts", "event_id"]).reset_index(drop=True)
        n = len(pdf)
        ts0 = pdf["ts"].iloc[0]
        x = ((pdf["ts"] - ts0).dt.total_seconds()).astype("int64").to_numpy()
        import numpy as np

        y = np.floor(pdf["value"].to_numpy() * 1_000_000.0).astype("int64")
        keep = [0]
        if n > 2:
            nb = B - 2
            bucket = ((pd.RangeIndex(n).to_numpy() - 1) * nb) // (n - 2)
            # middle indices 1..n-2 carry buckets 0..nb-1 under this map
            prev = 0
            for k in range(nb):
                idx = [i for i in range(1, n - 1) if bucket[i] == k]
                if not idx:
                    continue
                nxt = [i for i in range(1, n - 1) if bucket[i] == k + 1]
                if nxt:
                    sx = int(sum(int(x[i]) for i in nxt))
                    sy = int(sum(int(y[i]) for i in nxt))
                    c = len(nxt)
                else:  # last middle bucket: anchor on the final point
                    sx, sy, c = int(x[n - 1]), int(y[n - 1]), 1
                xp, yp = int(x[prev]), int(y[prev])
                best, best_area = None, -1
                for i in idx:
                    area = abs(
                        (xp * c - sx) * (int(y[i]) - yp)
                        - (xp - int(x[i])) * (sy - yp * c)
                    )
                    if area > best_area:  # strict: earliest wins ties
                        best, best_area = i, area
                keep.append(best)
                prev = best
        keep.append(n - 1)
        out = pdf.iloc[keep][["event_type", "ts", "value"]].copy()
        out.insert(1, "keep_idx", range(len(keep)))
        return out

    events = load_table(spark, sf_dir, "events").select(
        "event_type", "ts", "event_id", "value"
    )
    return (
        events.groupBy("event_type")
        .applyInPandas(lttb, schema)
        .orderBy("event_type", "keep_idx")
    )


def _sql_lttb() -> str:
    nb = LTTB_B - 2
    pre = f"""
ranked AS (
  SELECT event_type, ts, value,
         ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY ts, event_id) AS r,
         COUNT(*) OVER (PARTITION BY event_type) AS n,
         CAST(date_diff('second',
              MIN(CAST(ts AS TIMESTAMP)) OVER (PARTITION BY event_type),
              CAST(ts AS TIMESTAMP)) AS BIGINT) AS x,
         CAST(FLOOR(value * 1000000.0) AS BIGINT) AS y
  FROM events
), mid AS (
  SELECT *, ((r - 2) * {nb}) // (n - 2) AS bucket
  FROM ranked WHERE r >= 2 AND r <= n - 1
), anchors AS (
  SELECT event_type, bucket, COUNT(*) AS c, SUM(x) AS sx, SUM(y) AS sy
  FROM mid GROUP BY event_type, bucket
), lastpt AS (
  SELECT event_type, x, y, ts, value FROM ranked WHERE r = n
), firstpt AS (
  SELECT event_type, x, y, ts, value FROM ranked WHERE r = 1
), s0 AS (
  SELECT event_type, x AS xp, y AS yp FROM firstpt
)"""
    stages = []
    for k in range(nb):
        anchor = (
            f"(SELECT a.event_type, a.c, a.sx, a.sy FROM anchors a WHERE a.bucket = {k + 1})"
            if k + 1 < nb
            else "(SELECT event_type, 1 AS c, x AS sx, y AS sy FROM lastpt)"
        )
        stages.append(f"""
pick{k} AS (
  SELECT event_type, ts, value, x, y FROM (
    SELECT m.event_type, m.ts, m.value, m.x, m.y,
           ROW_NUMBER() OVER (
             PARTITION BY m.event_type
             ORDER BY ABS((s.xp * an.c - an.sx) * (m.y - s.yp)
                          - (s.xp - m.x) * (an.sy - s.yp * an.c)) DESC,
                      m.ts ASC
           ) AS rk
    FROM mid m
    JOIN s{k} s USING (event_type)
    JOIN {anchor} an USING (event_type)
    WHERE m.bucket = {k}
  ) WHERE rk = 1
),
s{k + 1} AS (
  SELECT event_type, x AS xp, y AS yp FROM pick{k}
)""")
    picks = " UNION ALL ".join(
        f"SELECT event_type, {k + 1} AS keep_idx, ts, value FROM pick{k}"
        for k in range(nb)
    )
    return (
        "WITH "
        + pre
        + ","
        + ",".join(stages)
        + f"""
SELECT event_type, CAST(keep_idx AS INTEGER) AS keep_idx,
       CAST(ts AS TIMESTAMP) AS ts, value
FROM (
  SELECT event_type, 0 AS keep_idx, ts, value FROM firstpt
  UNION ALL
  {picks}
  UNION ALL
  SELECT event_type, {nb + 1} AS keep_idx, ts, value FROM lastpt
)
ORDER BY event_type, keep_idx
"""
    )


# ---------------------------------------------------------------------------
# Holt double exponential smoothing (level + trend) per user
# ---------------------------------------------------------------------------

HOLT_H = 7  # forecast horizon (steps ahead)


def q_events_holt_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holt's linear-trend (double exponential) smoothing per user with
    α = β = 1/2: l_t = (x_t + l_{t−1} + b_{t−1})/2, b_t = (l_t − l_{t−1}
    + b_{t−1})/2, seeded l₁ = x₁, b₁ = 0; output the final state and the
    h-step forecast l + h·b — the classic short-horizon trend forecaster
    one rung above ``events_forecast_baseline``'s seasonal-naive.

    Unlike EWMA (one-state — decomposable into the hot-key-safe affine
    chunk fold, ``q_events_ewma``), the two-state Holt recurrence has no
    cheap order-free decomposition, so this entry uses the OTHER
    legitimate Spark shape for per-key sequential math: Arrow-batched
    ``applyInPandas`` (one python invocation per user batch, state =
    two doubles, cost bounded by per-key cardinality — the same
    economics as the streaming EWMA's applyInPandasWithState). The
    oracle runs the identical IEEE op sequence as a RECURSIVE CTE
    (set-at-a-time over all users), the float twin of the ADPCM
    integer-recurrence proof: halving constants mean every step is the
    same correctly-rounded double arithmetic on both engines, so the
    gate compares bit-identical results with NO quantization."""
    import pandas as _pd_outer  # noqa: F401 (documents the Arrow path)

    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("user_id", T.LongType()),
            T.StructField("n", T.LongType()),
            T.StructField("level", T.DoubleType()),
            T.StructField("trend", T.DoubleType()),
            T.StructField("forecast_h", T.DoubleType()),
        ]
    )

    def holt(pdf):
        import pandas as pd

        pdf = pdf.sort_values(["ts", "event_id"])
        xs = pdf["value"].to_numpy()
        level = float(xs[0])
        trend = 0.0
        for x in xs[1:]:
            prev = level
            level = (float(x) + level + trend) / 2.0
            trend = (level - prev + trend) / 2.0
        return pd.DataFrame(
            {
                "user_id": [int(pdf["user_id"].iloc[0])],
                "n": [len(xs)],
                "level": [level],
                "trend": [trend],
                "forecast_h": [level + HOLT_H * trend],
            }
        )

    events = load_table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", "value"
    )
    return (
        events.groupBy("user_id")
        .applyInPandas(holt, schema)
        .orderBy("user_id")
    )


_ORACLE_HOLT = f"""
WITH RECURSIVE ranked AS (
  SELECT user_id, value,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS r,
         COUNT(*) OVER (PARTITION BY user_id) AS n
  FROM events
), state AS (
  SELECT user_id, CAST(1 AS BIGINT) AS r, n,
         CAST(value AS DOUBLE) AS level, CAST(0.0 AS DOUBLE) AS trend
  FROM ranked WHERE r = 1
  UNION ALL
  SELECT s.user_id, s.r + 1, s.n,
         (CAST(e.value AS DOUBLE) + s.level + s.trend) / 2.0,
         (((CAST(e.value AS DOUBLE) + s.level + s.trend) / 2.0) - s.level + s.trend) / 2.0
  FROM state s JOIN ranked e ON e.user_id = s.user_id AND e.r = s.r + 1
)
SELECT user_id, CAST(n AS BIGINT) AS n, level, trend,
       level + {HOLT_H} * trend AS forecast_h
FROM state WHERE r = n
ORDER BY user_id
"""


# ---------------------------------------------------------------------------
# Robust MAD outlier detection (median / median-absolute-deviation)
# ---------------------------------------------------------------------------

MAD_K = 1.4826  # consistency constant vs sigma under normality (literal)
MAD_CUT = 3.0


def q_events_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust per-type outlier screen: median + MAD (median absolute
    deviation) instead of mean/stddev — the estimator of choice when the
    contamination you are hunting is exactly what would poison the
    mean-based z-score (``events_zscore_anomaly`` is the classical
    twin). Flags |x − med| > 3·1.4826·MAD.

    Exactness: both medians are LOWER medians — real data values picked
    by rank (percentile_disc semantics), not interpolated — so every
    derived quantity is either a data value or one fixed-order IEEE
    product/compare; bit-stable across engines.

    Scale shape: two per-key rank windows (event_type-partitioned sort —
    the inherent cost of exact per-group order statistics; the bucketed
    global-rank trick in ``exact_quantiles_bucketed`` is the documented
    escape hatch when one key dominates), then one count agg. Output is
    |types| rows."""
    events = load_table(spark, sf_dir, "events")
    w_rank = Window.partitionBy("event_type").orderBy("value", "event_id")
    w_n = Window.partitionBy("event_type")
    med = (
        events.select("event_type", "value", "event_id")
        .withColumn("r", F.row_number().over(w_rank))
        .withColumn("n", F.count(F.lit(1)).over(w_n))
        .filter(F.col("r") == F.expr("(n + 1) DIV 2"))  # lower median rank
        .select("event_type", F.col("value").alias("med"), F.col("n").alias("n"))
    )
    dev = events.join(F.broadcast(med), "event_type").select(
        "event_type",
        "value",
        "event_id",
        "n",
        "med",
        F.abs(F.col("value") - F.col("med")).alias("adev"),
    )
    w_rank2 = Window.partitionBy("event_type").orderBy("adev", "event_id")
    mad = (
        dev.withColumn("r", F.row_number().over(w_rank2))
        .filter(F.col("r") == F.expr("(n + 1) DIV 2"))
        .select("event_type", F.col("adev").alias("mad"))
    )
    cut = F.lit(MAD_CUT) * F.lit(MAD_K) * F.col("mad")
    return (
        dev.join(F.broadcast(mad), "event_type")
        .groupBy("event_type")
        .agg(
            F.max("n").alias("n"),
            F.max("med").alias("median"),
            F.max("mad").alias("mad"),
            F.sum(F.when(F.col("adev") > cut, 1).otherwise(0)).alias("n_outliers"),
        )
        .select(
            "event_type",
            F.col("n").cast("long").alias("n"),
            "median",
            "mad",
            F.col("n_outliers").cast("long").alias("n_outliers"),
        )
        .orderBy("event_type")
    )


_ORACLE_MAD_OUTLIERS = f"""
WITH ranked AS (
  SELECT event_type, value, event_id,
         ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY value, event_id) AS r,
         COUNT(*) OVER (PARTITION BY event_type) AS n
  FROM events
), med AS (
  SELECT event_type, value AS med, n FROM ranked WHERE r = (n + 1) // 2
), dev AS (
  SELECT e.event_type, e.value, e.event_id, m.n, m.med,
         ABS(e.value - m.med) AS adev
  FROM events e JOIN med m USING (event_type)
), ranked2 AS (
  SELECT event_type, adev,
         ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY adev, event_id) AS r,
         n
  FROM dev
), mad AS (
  SELECT event_type, adev AS mad FROM ranked2 WHERE r = (n + 1) // 2
)
SELECT d.event_type, CAST(MAX(d.n) AS BIGINT) AS n,
       MAX(d.med) AS median, MAX(m.mad) AS mad,
       CAST(SUM(CASE WHEN d.adev > {MAD_CUT} * {MAD_K} * m.mad THEN 1 ELSE 0 END)
            AS BIGINT) AS n_outliers
FROM dev d JOIN mad m USING (event_type)
GROUP BY d.event_type
ORDER BY d.event_type
"""


# ---------------------------------------------------------------------------
# L28 engagement distribution (users by active-day count)
# ---------------------------------------------------------------------------

L28_DAYS = 28
L28_BUCKETS = [(1, 7, "L1-7"), (8, 14, "L8-14"), (15, 21, "L15-21"), (22, 28, "L22-28")]


def q_events_engagement_l28(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L28 engagement distribution: bucket every user by DISTINCT active
    days within the trailing 28 days of the observation window — the
    growth-accounting complement of ``events_dau_mau`` (stickiness is one
    ratio; the L-distribution shows whether it comes from a core of
    daily users or a long casual tail, which is what product teams
    actually act on).

    Exactness: active days are exact distinct integer day indices
    (relative to the window end, so the trailing filter is integer
    arithmetic); buckets are literal ranges; outputs are counts plus one
    exact share division per bucket. Scale shape: (user, day) distinct
    collapse (map-side combinable), per-user count, then a 4-group agg —
    the canonical two-level rollup, nothing data-sized after the first
    agg.
    """
    events = load_table(spark, sf_dir, "events")
    day = F.expr(
        "CAST(unix_timestamp(ts) DIV 86400 AS BIGINT)"
    )
    horizon = events.agg(F.max(day).alias("max_day"))
    user_days = (
        events.select("user_id", day.alias("d"))
        .crossJoin(F.broadcast(horizon))
        .filter(F.col("d") > F.col("max_day") - F.lit(L28_DAYS))
        .select("user_id", "d")
        .distinct()
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("active_days"))
    )
    bucket = F.when(
        (F.col("active_days") >= L28_BUCKETS[0][0])
        & (F.col("active_days") <= L28_BUCKETS[0][1]),
        F.lit(L28_BUCKETS[0][2]),
    )
    for lo, hi, name in L28_BUCKETS[1:]:
        bucket = bucket.when(
            (F.col("active_days") >= lo) & (F.col("active_days") <= hi), F.lit(name)
        )
    per_b = (
        user_days.select(bucket.alias("bucket"))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).cast("long").alias("n_users"))
    )
    total = F.sum("n_users").over(Window.partitionBy()).cast("long")
    return per_b.select(
        "bucket",
        "n_users",
        (F.col("n_users").cast("double") / total.cast("double")).alias("share"),
    ).orderBy("bucket")


def _sql_engagement_l28() -> str:
    case = " ".join(
        f"WHEN active_days BETWEEN {lo} AND {hi} THEN '{name}'"
        for lo, hi, name in L28_BUCKETS
    )
    return f"""
WITH horizon AS (
  SELECT MAX(CAST(floor(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT) // 86400) AS max_day
  FROM events
), user_days AS (
  SELECT user_id, COUNT(*) AS active_days FROM (
    SELECT DISTINCT user_id,
           CAST(floor(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT) // 86400 AS d
    FROM events, horizon
    WHERE CAST(floor(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT) // 86400
          > max_day - {L28_DAYS}
  ) GROUP BY 1
), per_b AS (
  SELECT CASE {case} END AS bucket,
         CAST(COUNT(*) AS BIGINT) AS n_users
  FROM user_days GROUP BY 1
)
SELECT bucket, n_users,
       CAST(n_users AS DOUBLE) / CAST(SUM(n_users) OVER () AS DOUBLE) AS share
FROM per_b
ORDER BY bucket
"""


# ---------------------------------------------------------------------------
# Holt–Winters additive seasonal smoothing (triple exponential)
# ---------------------------------------------------------------------------

HW_PERIOD = 24  # hourly series, daily seasonality
HW_HORIZON = 24  # forecast one full season ahead


def q_events_holt_winters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holt–Winters ADDITIVE seasonal smoothing of the global hourly event
    count with α=β=γ=1/2 and period {m}: level/trend/seasonal recurrence
    l_t = ((x_t−s_{{t−m}})+(l+b))/2, b_t = ((l_t−l)+b)/2,
    s_t = ((x_t−l_t)+s_{{t−m}})/2, seeded l₁=x₁, b₁=0, s≡0 (γ=1/2 learns
    the season within two cycles; a production warm start would seed with
    first-season means — same machinery). Output: the next full season of
    forecasts l+h·b+s_{{t+h−m}}, h=1..{h} — the seasonal rung above
    ``events_holt_linear`` and the closing entry of the forecasting
    ladder (seasonal-naive → Holt → Holt–Winters).

    Like Holt, the two-state+season recurrence has no order-free
    decomposition, so Spark runs the IEEE op sequence in an Arrow-batched
    ``applyInPandas`` over the DOMAIN-SIZED series (the hourly grid —
    ~10³ points at any data scale; the data-sized work is the count agg
    that builds it), while the oracle replays the identical sequence as a
    RECURSIVE CTE whose state row carries the {m}-slot seasonal ring as a
    LIST column (head = s_{{t−m}}, step = append-new/drop-head). Halving
    constants keep every step correctly-rounded double arithmetic —
    bit-identical cross-engine, no quantization.
    """
    from pyspark.sql import types as T

    events = load_table(spark, sf_dir, "events")
    h = (F.unix_timestamp(F.col("ts")) / F.lit(3600)).cast("bigint")
    counts = events.groupBy(h.alias("h")).agg(F.count(F.lit(1)).alias("c"))
    bounds = events.agg(
        (F.min(F.unix_timestamp(F.col("ts"))) / F.lit(3600)).cast("bigint").alias("lo"),
        (F.max(F.unix_timestamp(F.col("ts"))) / F.lit(3600)).cast("bigint").alias("hi"),
    )
    spine = bounds.select(F.explode(F.sequence("lo", "hi")).alias("h"))
    series = spine.join(counts, "h", "left").select(
        "h", F.coalesce("c", F.lit(0)).cast("long").alias("c")
    )

    schema = T.StructType(
        [
            T.StructField("horizon_h", T.IntegerType()),
            T.StructField("n_points", T.LongType()),
            T.StructField("level", T.DoubleType()),
            T.StructField("trend", T.DoubleType()),
            T.StructField("forecast", T.DoubleType()),
        ]
    )
    period, horizon = HW_PERIOD, HW_HORIZON

    def hw(pdf):
        import pandas as pd

        pdf = pdf.sort_values("h")
        xs = pdf["c"].to_numpy()
        level = float(xs[0])
        trend = 0.0
        season = [0.0] * period
        for x in xs[1:]:
            s_prev = season[0]
            prev_l = level
            level = ((float(x) - s_prev) + (level + trend)) / 2.0
            trend = ((level - prev_l) + trend) / 2.0
            s_new = ((float(x) - level) + s_prev) / 2.0
            season = season[1:] + [s_new]
        return pd.DataFrame(
            {
                "horizon_h": list(range(1, horizon + 1)),
                "n_points": [len(xs)] * horizon,
                "level": [level] * horizon,
                "trend": [trend] * horizon,
                "forecast": [
                    level + float(k) * trend + season[k - 1]
                    for k in range(1, horizon + 1)
                ],
            }
        )

    return (
        series.groupBy(F.lit(1).alias("g"))
        .applyInPandas(hw, schema)
        .orderBy("horizon_h")
    )
q_events_holt_winters.__doc__ = q_events_holt_winters.__doc__ and q_events_holt_winters.__doc__.format(m=HW_PERIOD, h=HW_HORIZON)


_ORACLE_HW = f"""
WITH RECURSIVE counts AS (
  SELECT CAST(floor(epoch(CAST(ts AS TIMESTAMP)) / 3600) AS BIGINT) AS h,
         CAST(COUNT(*) AS BIGINT) AS c
  FROM events GROUP BY 1
), bounds AS (
  SELECT CAST(floor(MIN(epoch(CAST(ts AS TIMESTAMP))) / 3600) AS BIGINT) AS lo,
         CAST(floor(MAX(epoch(CAST(ts AS TIMESTAMP))) / 3600) AS BIGINT) AS hi
  FROM events
), series AS (
  SELECT ROW_NUMBER() OVER (ORDER BY s.h) AS t,
         CAST(COUNT(*) OVER () AS BIGINT) AS n,
         CAST(COALESCE(c.c, 0) AS DOUBLE) AS x
  FROM (SELECT unnest(generate_series(lo, hi)) AS h FROM bounds) s
  LEFT JOIN counts c ON s.h = c.h
), state AS (
  SELECT t, n, x AS l, CAST(0.0 AS DOUBLE) AS b,
         [CAST(0.0 AS DOUBLE) FOR i IN range({HW_PERIOD})] AS s
  FROM series WHERE t = 1
  UNION ALL
  SELECT e.t, st.n,
         ((e.x - st.s[1]) + (st.l + st.b)) / 2.0,
         (((((e.x - st.s[1]) + (st.l + st.b)) / 2.0) - st.l) + st.b) / 2.0,
         list_append(
           st.s[2:],
           ((e.x - (((e.x - st.s[1]) + (st.l + st.b)) / 2.0)) + st.s[1]) / 2.0
         )
  FROM state st JOIN series e ON e.t = st.t + 1
), final AS (
  SELECT * FROM state WHERE t = n
)
SELECT CAST(k AS INTEGER) AS horizon_h,
       n AS n_points,
       l AS level,
       b AS trend,
       l + CAST(k AS DOUBLE) * b + s[k] AS forecast
FROM final, (SELECT unnest(generate_series(1, {HW_HORIZON})) AS k)
ORDER BY horizon_h
"""


# ---------------------------------------------------------------------------
# Linear interpolation of an irregular series onto the hour grid
# ---------------------------------------------------------------------------


def q_events_interpolate_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resample each event type's irregular ``value`` series onto the
    exact hour grid by linear interpolation between the straddling
    observations — the regularization step before any fixed-step model
    (the forecasting entries all assume a regular grid; ``events_twap``
    integrates between points, this EVALUATES between points).

    Implemented with the union-and-fill idiom (no join): grid marks and
    observations interleave in ONE per-type time sort; backward-looking
    ``last(…, ignorenulls)`` carries (t₀,y₀), a forward frame picks
    (t₁,y₁), and src ordering (events sort before the grid mark at equal
    t) pins boundary semantics exactly: an observation AT the mark is the
    left endpoint (interpolation returns it), never the right. Grid rows
    outside the observed span drop (no extrapolation). The interpolation
    y₀+(y₁−y₀)·(h−t₀)/(t₁−t₀) is one fixed-shape IEEE expression on
    integer-second times — bit-identical across engines.

    Scale shape: ONE range-partitionable sort per type over events+grid;
    no self-join, no shuffle beyond the sort. The classic alternative —
    an as-of join per direction — costs two sorted joins; union-and-fill
    does both directions in one pass.
    """
    events = load_table(spark, sf_dir, "events")
    s = F.unix_timestamp(F.col("ts"))
    obs = events.select(
        "event_type",
        s.alias("t"),
        F.lit(0).alias("src"),
        F.col("event_id").alias("eid"),
        "value",
    )
    bounds = events.agg(
        (F.min(s) / F.lit(3600)).cast("bigint").alias("lo"),
        (F.max(s) / F.lit(3600)).cast("bigint").alias("hi"),
    )
    types = events.select("event_type").distinct()
    grid = (
        types.crossJoin(F.broadcast(bounds))
        .select("event_type", F.explode(F.sequence("lo", "hi")).alias("h"))
        .select(
            "event_type",
            (F.col("h") * 3600).alias("t"),
            F.lit(1).alias("src"),
            F.lit(None).cast("long").alias("eid"),
            F.lit(None).cast("double").alias("value"),
        )
    )
    # Both directions as RUNNING frames (state carried row-by-row, O(n)):
    # a literal (1, unboundedFollowing) frame with first(ignorenulls) makes
    # Spark re-scan the remainder of the partition PER ROW — O(n²), measured
    # wedged at the ×16 scale probe. The "next" observation is instead the
    # nearest preceding non-null in REVERSE sort order; reversing src too
    # keeps the boundary rule (an observation AT the mark is only the left
    # endpoint) bit-for-bit identical to the forward formulation.
    w_back = (
        Window.partitionBy("event_type")
        .orderBy("t", "src", "eid")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w_fwd_rev = (
        Window.partitionBy("event_type")
        .orderBy(F.col("t").desc(), F.col("src").desc(), F.col("eid").desc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    ev_t = F.when(F.col("src") == 0, F.col("t"))
    ev_v = F.when(F.col("src") == 0, F.col("value"))
    filled = obs.unionByName(grid).select(
        "event_type",
        "t",
        "src",
        F.last(ev_t, ignorenulls=True).over(w_back).alias("t0"),
        F.last(ev_v, ignorenulls=True).over(w_back).alias("y0"),
        F.last(ev_t, ignorenulls=True).over(w_fwd_rev).alias("t1"),
        F.last(ev_v, ignorenulls=True).over(w_fwd_rev).alias("y1"),
    )
    interp = F.col("y0") + (F.col("y1") - F.col("y0")) * (
        (F.col("t") - F.col("t0")).cast("double")
        / (F.col("t1") - F.col("t0")).cast("double")
    )
    return (
        filled.filter(
            (F.col("src") == 1)
            & F.col("t0").isNotNull()
            & F.col("t1").isNotNull()
        )
        .select(
            "event_type",
            F.expr("t DIV 3600").alias("hour_idx"),
            interp.alias("value_interp"),
        )
        .orderBy("event_type", "hour_idx")
    )


_ORACLE_INTERP = """
WITH obs AS (
  SELECT event_type,
         CAST(floor(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT) AS t,
         0 AS src, event_id AS eid, value
  FROM events
), bounds AS (
  SELECT CAST(floor(MIN(epoch(CAST(ts AS TIMESTAMP))) / 3600) AS BIGINT) AS lo,
         CAST(floor(MAX(epoch(CAST(ts AS TIMESTAMP))) / 3600) AS BIGINT) AS hi
  FROM events
), grid AS (
  SELECT t.event_type, unnest(generate_series(lo, hi)) * 3600 AS t,
         1 AS src, CAST(NULL AS BIGINT) AS eid, CAST(NULL AS DOUBLE) AS value
  FROM (SELECT DISTINCT event_type FROM events) t, bounds
), u AS (
  SELECT * FROM obs UNION ALL SELECT * FROM grid
), filled AS (
  SELECT event_type, t, src,
         LAST_VALUE(CASE WHEN src = 0 THEN t END IGNORE NULLS) OVER wb AS t0,
         LAST_VALUE(CASE WHEN src = 0 THEN value END IGNORE NULLS) OVER wb AS y0,
         LAST_VALUE(CASE WHEN src = 0 THEN t END IGNORE NULLS) OVER wf AS t1,
         LAST_VALUE(CASE WHEN src = 0 THEN value END IGNORE NULLS) OVER wf AS y1
  FROM u
  WINDOW wb AS (PARTITION BY event_type ORDER BY t, src, eid
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
         wf AS (PARTITION BY event_type ORDER BY t DESC, src DESC, eid DESC
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
)
SELECT event_type, t // 3600 AS hour_idx,
       y0 + (y1 - y0) * (CAST(t - t0 AS DOUBLE) / CAST(t1 - t0 AS DOUBLE))
         AS value_interp
FROM filled
WHERE src = 1 AND t0 IS NOT NULL AND t1 IS NOT NULL
ORDER BY event_type, hour_idx
"""


# ---------------------------------------------------------------------------
# Time-to-convert distribution (first view → first purchase)
# ---------------------------------------------------------------------------


def q_events_time_to_convert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Latency from a user's FIRST view to their FIRST purchase (converting
    users only), summarized as exact p50/p90/p99 — the time-dimension
    complement of ``events_funnel`` (which counts who converts; this
    measures how long conversion takes, the metric that sizes retargeting
    windows and attribution lookbacks).

    Exactness: latencies are integer epoch-second differences; the
    percentiles are RANK PICKS of real data values at ceil(q·n) (integer
    `DIV` arithmetic, ties broken by user_id) — percentile_disc
    semantics, never interpolated doubles. Scale shape: one (user,type)
    conditional-min hash agg (map-side combinable), then a single sort
    window over the converter set; output is ONE row.
    """
    events = load_table(spark, sf_dir, "events")
    s = F.unix_timestamp(F.col("ts"))
    per_user = (
        events.filter(F.col("event_type").isin("view", "purchase"))
        .groupBy("user_id")
        .agg(
            F.min(F.when(F.col("event_type") == "view", s)).alias("first_view"),
            F.min(F.when(F.col("event_type") == "purchase", s)).alias(
                "first_purchase"
            ),
        )
    )
    conv = per_user.filter(
        F.col("first_view").isNotNull()
        & F.col("first_purchase").isNotNull()
        & (F.col("first_purchase") >= F.col("first_view"))
    ).select(
        "user_id",
        (F.col("first_purchase") - F.col("first_view")).alias("delta_s"),
    )
    n_tbl = conv.agg(F.count(F.lit(1)).cast("long").alias("n"))
    ranked = (
        _cum_prev(conv, ["delta_s", "user_id"], {"_rp": F.lit(1)}, materialize=True)
        .crossJoin(F.broadcast(n_tbl))
        .select(
            "delta_s",
            (F.col("_rp") + F.lit(1)).alias("rn"),
            "n",
        )
    )
    return ranked.agg(
        F.max("n").alias("n_converters"),
        F.max(F.when(F.col("rn") == F.expr("(n + 1) DIV 2"), F.col("delta_s"))).alias(
            "p50_s"
        ),
        F.max(
            F.when(F.col("rn") == F.expr("(9 * n + 9) DIV 10"), F.col("delta_s"))
        ).alias("p90_s"),
        F.max(
            F.when(F.col("rn") == F.expr("(99 * n + 99) DIV 100"), F.col("delta_s"))
        ).alias("p99_s"),
    )


_ORACLE_TIME_TO_CONVERT = """
WITH per_user AS (
  SELECT user_id,
         MIN(CASE WHEN event_type = 'view'
                  THEN CAST(floor(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT) END)
           AS first_view,
         MIN(CASE WHEN event_type = 'purchase'
                  THEN CAST(floor(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT) END)
           AS first_purchase
  FROM events
  WHERE event_type IN ('view', 'purchase')
  GROUP BY 1
), conv AS (
  SELECT user_id, first_purchase - first_view AS delta_s
  FROM per_user
  WHERE first_view IS NOT NULL AND first_purchase IS NOT NULL
    AND first_purchase >= first_view
), ranked AS (
  SELECT delta_s,
         ROW_NUMBER() OVER (ORDER BY delta_s, user_id) AS rn,
         CAST(COUNT(*) OVER () AS BIGINT) AS n
  FROM conv
)
SELECT MAX(n) AS n_converters,
       MAX(CASE WHEN rn = (n + 1) // 2 THEN delta_s END) AS p50_s,
       MAX(CASE WHEN rn = (9 * n + 9) // 10 THEN delta_s END) AS p90_s,
       MAX(CASE WHEN rn = (99 * n + 99) // 100 THEN delta_s END) AS p99_s
FROM ranked
"""


# ---------------------------------------------------------------------------
# Local-maxima peak detection on the hourly series
# ---------------------------------------------------------------------------

PEAK_Z = 2.0  # a peak must clear mean + 2σ of its type's hourly series


def q_events_peak_detection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Traffic peak detection per event type: hours that are strict local
    maxima of the hourly count series AND clear mean + {z}σ — the alerting
    primitive behind every ops dashboard's "spike" annotation (local-max
    screening suppresses the shoulder hours a pure threshold would also
    flag; the threshold suppresses ordinary diurnal maxima).

    Built on the DENSE hour spine per type (zero hours are real — a lone
    busy hour between silent ones IS a peak; ``events_cross_correlation``
    uses the same spine discipline). Counts are exact integers; μ and σ
    come from exact integer moments, so the threshold compare and the
    reported z-score are fixed-shape IEEE expressions — bit-stable.

    Scale shape: raw scan → (type, hour) hash agg (map-side combine);
    spine join, neighbor lags, and the moment agg all run on the
    compressed |types|×|hours| domain. At 100 TB that domain is ~10⁷
    cells — still cluster-trivial.
    """
    events = load_table(spark, sf_dir, "events")
    h = (F.unix_timestamp(F.col("ts")) / F.lit(3600)).cast("bigint")
    counts = events.groupBy("event_type", h.alias("h")).agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    bounds = events.agg(
        (F.min(F.unix_timestamp(F.col("ts"))) / F.lit(3600)).cast("bigint").alias("lo"),
        (F.max(F.unix_timestamp(F.col("ts"))) / F.lit(3600)).cast("bigint").alias("hi"),
    )
    types = events.select("event_type").distinct()
    spine = types.crossJoin(F.broadcast(bounds)).select(
        "event_type", F.explode(F.sequence("lo", "hi")).alias("h")
    )
    base = spine.join(counts, ["event_type", "h"], "left").select(
        "event_type", "h", F.coalesce("c", F.lit(0)).alias("c")
    )
    mom = base.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.col("c").cast("decimal(18,0)")).alias("sc"),
        F.sum(
            F.col("c").cast("decimal(18,0)") * F.col("c").cast("decimal(18,0)")
        ).alias("sc2"),
    )
    nd = F.col("n").cast("double")
    scd, sc2d = F.col("sc").cast("double"), F.col("sc2").cast("double")
    mu = scd / nd
    sigma = F.sqrt((nd * sc2d - scd * scd) / (nd * nd))
    w = Window.partitionBy("event_type").orderBy("h")
    neigh = base.select(
        "event_type",
        "h",
        "c",
        F.lag("c").over(w).alias("prev_c"),
        F.lead("c").over(w).alias("next_c"),
    )
    return (
        neigh.join(
            F.broadcast(mom.select("event_type", mu.alias("mu"), sigma.alias("sigma"))),
            "event_type",
        )
        .filter(
            F.col("prev_c").isNotNull()
            & F.col("next_c").isNotNull()
            & (F.col("c") > F.col("prev_c"))
            & (F.col("c") > F.col("next_c"))
            & (
                F.col("c").cast("double")
                > F.col("mu") + F.lit(PEAK_Z) * F.col("sigma")
            )
        )
        .select(
            "event_type",
            F.col("h").alias("hour_idx"),
            F.col("c").alias("n_events"),
            ((F.col("c").cast("double") - F.col("mu")) / F.col("sigma")).alias(
                "zscore"
            ),
        )
        .orderBy("event_type", "hour_idx")
    )
q_events_peak_detection.__doc__ = q_events_peak_detection.__doc__ and q_events_peak_detection.__doc__.format(z=int(PEAK_Z))


_ORACLE_PEAKS = f"""
WITH counts AS (
  SELECT event_type,
         CAST(floor(epoch(CAST(ts AS TIMESTAMP)) / 3600) AS BIGINT) AS h,
         CAST(COUNT(*) AS BIGINT) AS c
  FROM events GROUP BY 1, 2
), bounds AS (
  SELECT CAST(floor(MIN(epoch(CAST(ts AS TIMESTAMP))) / 3600) AS BIGINT) AS lo,
         CAST(floor(MAX(epoch(CAST(ts AS TIMESTAMP))) / 3600) AS BIGINT) AS hi
  FROM events
), spine AS (
  SELECT t.event_type, unnest(generate_series(lo, hi)) AS h
  FROM (SELECT DISTINCT event_type FROM events) t, bounds
), base AS (
  SELECT spine.event_type, spine.h, COALESCE(counts.c, 0) AS c
  FROM spine LEFT JOIN counts
    ON spine.event_type = counts.event_type AND spine.h = counts.h
), mom AS (
  SELECT event_type,
         CAST(COUNT(*) AS BIGINT) AS n,
         SUM(CAST(c AS DECIMAL(18,0))) AS sc,
         SUM(CAST(c AS DECIMAL(18,0)) * CAST(c AS DECIMAL(18,0))) AS sc2
  FROM base GROUP BY 1
), stats AS (
  SELECT event_type,
         CAST(sc AS DOUBLE) / CAST(n AS DOUBLE) AS mu,
         SQRT((CAST(n AS DOUBLE) * CAST(sc2 AS DOUBLE)
                 - CAST(sc AS DOUBLE) * CAST(sc AS DOUBLE))
              / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE))) AS sigma
  FROM mom
), neigh AS (
  SELECT event_type, h, c,
         LAG(c) OVER w AS prev_c, LEAD(c) OVER w AS next_c
  FROM base
  WINDOW w AS (PARTITION BY event_type ORDER BY h)
)
SELECT n.event_type, n.h AS hour_idx, n.c AS n_events,
       (CAST(n.c AS DOUBLE) - s.mu) / s.sigma AS zscore
FROM neigh n JOIN stats s ON n.event_type = s.event_type
WHERE n.prev_c IS NOT NULL AND n.next_c IS NOT NULL
  AND n.c > n.prev_c AND n.c > n.next_c
  AND CAST(n.c AS DOUBLE) > s.mu + {float(PEAK_Z)!r} * s.sigma
ORDER BY n.event_type, hour_idx
"""


# ---------------------------------------------------------------------------
# Kaplan–Meier survival curve (user churn with right-censoring)
# ---------------------------------------------------------------------------

KM_CENSOR_S = 86400  # users last seen within the final 24h are right-censored


def q_survival_kaplan_meier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan–Meier survival estimate of user lifetime (hours from first
    to last event), right-censoring users still active in the final 24h of
    the observation window — THE standard churn/survival curve, and the
    honest way to report retention when the window truncates lifetimes
    (naive "avg lifetime" is biased low; KM's risk-set construction is
    not).

    Each step factor (nᵣ−dᵣ)/nᵣ is one correctly-rounded division of
    exact integers; the cumulative product is inherently sequential, so —
    exactly like ``events_holt_linear`` — Spark runs the identical IEEE
    op sequence in an Arrow-batched ``applyInPandas`` while the oracle
    unrolls it as a RECURSIVE CTE: bit-identical with NO quantization.

    Scale shape: lifetimes and risk sets reduce distributively (per-user
    min/max hash agg, then a domain-sized cumulative window over distinct
    durations — ≤ observation-window hours, ~10³ rows at ANY data scale),
    so the sequential product runs on the compressed curve, never the
    raw rows. The single-group applyInPandas is domain-sized by
    construction.
    """
    from pyspark.sql import types as T

    events = load_table(spark, sf_dir, "events")
    s = F.unix_timestamp(F.col("ts"))
    per_user = events.groupBy("user_id").agg(
        F.min(s).alias("first_s"), F.max(s).alias("last_s")
    )
    horizon = events.agg(F.max(s).alias("max_s"))
    users = per_user.crossJoin(F.broadcast(horizon)).select(
        F.expr("(last_s - first_s) DIV 3600").alias("t"),
        (F.col("last_s") < F.col("max_s") - F.lit(KM_CENSOR_S))
        .cast("long")
        .alias("churned"),
    )
    per_t = users.groupBy("t").agg(
        F.count(F.lit(1)).cast("long").alias("cnt"),
        F.sum("churned").cast("long").alias("d"),
    )
    w_all = Window.partitionBy()
    w_prev = Window.orderBy("t").rowsBetween(Window.unboundedPreceding, -1)
    curve = (
        per_t.select(
            "t",
            "d",
            (
                F.sum("cnt").over(w_all)
                - F.coalesce(F.sum("cnt").over(w_prev), F.lit(0))
            ).alias("n_risk"),
        )
        .filter(F.col("d") > 0)
    )

    schema = T.StructType(
        [
            T.StructField("t_hours", T.LongType()),
            T.StructField("n_risk", T.LongType()),
            T.StructField("n_events", T.LongType()),
            T.StructField("survival", T.DoubleType()),
        ]
    )

    def km(pdf):
        import pandas as pd

        pdf = pdf.sort_values("t")
        surv = 1.0
        out = {"t_hours": [], "n_risk": [], "n_events": [], "survival": []}
        for t, d, n in zip(pdf["t"], pdf["d"], pdf["n_risk"]):
            surv = surv * (float(n - d) / float(n))
            out["t_hours"].append(int(t))
            out["n_risk"].append(int(n))
            out["n_events"].append(int(d))
            out["survival"].append(surv)
        return pd.DataFrame(out)

    return (
        curve.groupBy(F.lit(1).alias("g"))
        .applyInPandas(km, schema)
        .orderBy("t_hours")
    )


_ORACLE_KM = f"""
WITH RECURSIVE per_user AS (
  SELECT user_id,
         CAST(floor(MIN(epoch(CAST(ts AS TIMESTAMP)))) AS BIGINT) AS first_s,
         CAST(floor(MAX(epoch(CAST(ts AS TIMESTAMP)))) AS BIGINT) AS last_s
  FROM events GROUP BY 1
), users AS (
  SELECT (last_s - first_s) // 3600 AS t,
         CASE WHEN last_s < (SELECT MAX(last_s) FROM per_user) - {KM_CENSOR_S}
              THEN 1 ELSE 0 END AS churned
  FROM per_user
), per_t AS (
  SELECT t, CAST(COUNT(*) AS BIGINT) AS cnt, CAST(SUM(churned) AS BIGINT) AS d
  FROM users GROUP BY 1
), risk AS (
  -- windows over ALL durations (censor-only rows still shrink the risk
  -- set), so the d > 0 step filter must nest OUTSIDE this select
  SELECT t, d,
         CAST(SUM(cnt) OVER () AS BIGINT)
           - CAST(COALESCE(SUM(cnt) OVER (ORDER BY t
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
           AS n_risk
  FROM per_t
), curve AS (
  SELECT t, d, n_risk, ROW_NUMBER() OVER (ORDER BY t) AS r
  FROM risk
  WHERE d > 0
), state AS (
  SELECT t, n_risk, d, r,
         CAST(n_risk - d AS DOUBLE) / CAST(n_risk AS DOUBLE) AS surv
  FROM curve WHERE r = 1
  UNION ALL
  SELECT c.t, c.n_risk, c.d, c.r,
         s.surv * (CAST(c.n_risk - c.d AS DOUBLE) / CAST(c.n_risk AS DOUBLE))
  FROM state s JOIN curve c ON c.r = s.r + 1
)
SELECT t AS t_hours, n_risk, d AS n_events, surv AS survival
FROM state
ORDER BY t_hours
"""


# ---------------------------------------------------------------------------
# Lagged cross-correlation between two event series
# ---------------------------------------------------------------------------

XCORR_X, XCORR_Y = "view", "purchase"
XCORR_MAX_LAG = 3


def q_events_cross_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-correlation function between the hourly '{x}' and '{y}' count
    series at lags 0..{k} hours — the standard lead/lag diagnostic ("do
    views drive purchases, and with what delay?"); the two-series
    generalization of ``autocorr_lag``.

    Correctness requires a DENSE hour spine: silent hours are real zeros,
    and dropping them biases r upward (both series look co-active).
    The spine is sequence(min_h, max_h) zero-filled by left join, exactly
    like ``events_gap_fill``. Pearson r per lag comes from exact integer
    count moments (DECIMAL sums) — one IEEE expression per lag row.

    Scale shape: the raw scan collapses to ≤|hours| cells via one
    map-side-combinable hash agg; the lag explode (K+1 rows per hour cell)
    and the shifted equi-join run on the compressed domain, never on raw
    events. At 100 TB the hour domain is ~10⁶ rows — driver-trivial.
    """
    events = load_table(spark, sf_dir, "events")
    h = (F.unix_timestamp(F.col("ts")) / F.lit(3600)).cast("bigint")
    counts = (
        events.filter(F.col("event_type").isin(XCORR_X, XCORR_Y))
        .groupBy(h.alias("h"))
        .agg(
            F.sum((F.col("event_type") == XCORR_X).cast("long")).alias("cx"),
            F.sum((F.col("event_type") == XCORR_Y).cast("long")).alias("cy"),
        )
    )
    bounds = load_table(spark, sf_dir, "events").agg(
        (F.min(F.unix_timestamp(F.col("ts"))) / F.lit(3600)).cast("bigint").alias("lo"),
        (F.max(F.unix_timestamp(F.col("ts"))) / F.lit(3600)).cast("bigint").alias("hi"),
    )
    spine = bounds.select(F.explode(F.sequence("lo", "hi")).alias("h"))
    base = (
        spine.join(counts, "h", "left")
        .select(
            "h",
            F.coalesce("cx", F.lit(0)).alias("cx"),
            F.coalesce("cy", F.lit(0)).alias("cy"),
        )
    )
    lags = base.select(
        "h", "cx", F.explode(F.sequence(F.lit(0), F.lit(XCORR_MAX_LAG))).alias("lag")
    ).select("cx", "lag", (F.col("h") + F.col("lag")).alias("hy"))
    dec = lambda c: F.col(c).cast("decimal(18,0)")
    paired = lags.join(
        base.select(F.col("h").alias("hy"), "cy"), "hy"
    )
    m = paired.groupBy("lag").agg(
        F.count(F.lit(1)).cast("long").alias("n_hours"),
        F.sum(dec("cx")).alias("sx"),
        F.sum(dec("cy")).alias("sy"),
        F.sum(dec("cx") * dec("cy")).alias("sxy"),
        F.sum(dec("cx") * dec("cx")).alias("sxx"),
        F.sum(dec("cy") * dec("cy")).alias("syy"),
    )
    nd = F.col("n_hours").cast("double")
    sx, sy = F.col("sx").cast("double"), F.col("sy").cast("double")
    sxy, sxx, syy = (F.col(c).cast("double") for c in ("sxy", "sxx", "syy"))
    r = (nd * sxy - sx * sy) / F.sqrt(
        (nd * sxx - sx * sx) * (nd * syy - sy * sy)
    )
    return m.select(
        F.col("lag").cast("int").alias("lag_hours"), "n_hours", r.alias("xcorr_r")
    ).orderBy("lag_hours")
q_events_cross_correlation.__doc__ = q_events_cross_correlation.__doc__ and q_events_cross_correlation.__doc__.format(x=XCORR_X, y=XCORR_Y, k=XCORR_MAX_LAG)


_ORACLE_XCORR = f"""
WITH counts AS (
  SELECT CAST(floor(epoch(CAST(ts AS TIMESTAMP)) / 3600) AS BIGINT) AS h,
         CAST(SUM(CASE WHEN event_type = '{XCORR_X}' THEN 1 ELSE 0 END) AS BIGINT) AS cx,
         CAST(SUM(CASE WHEN event_type = '{XCORR_Y}' THEN 1 ELSE 0 END) AS BIGINT) AS cy
  FROM events
  WHERE event_type IN ('{XCORR_X}', '{XCORR_Y}')
  GROUP BY 1
), bounds AS (
  SELECT CAST(floor(MIN(epoch(CAST(ts AS TIMESTAMP))) / 3600) AS BIGINT) AS lo,
         CAST(floor(MAX(epoch(CAST(ts AS TIMESTAMP))) / 3600) AS BIGINT) AS hi
  FROM events
), spine AS (
  SELECT unnest(generate_series(lo, hi)) AS h FROM bounds
), base AS (
  SELECT spine.h, COALESCE(cx, 0) AS cx, COALESCE(cy, 0) AS cy
  FROM spine LEFT JOIN counts ON spine.h = counts.h
), lagged AS (
  SELECT a.lag, a.cx, b.cy
  FROM (SELECT h, cx, unnest(generate_series(0, {XCORR_MAX_LAG})) AS lag FROM base) a
  JOIN base b ON b.h = a.h + a.lag
), m AS (
  SELECT lag,
         CAST(COUNT(*) AS BIGINT) AS n_hours,
         SUM(CAST(cx AS DECIMAL(18,0))) AS sx,
         SUM(CAST(cy AS DECIMAL(18,0))) AS sy,
         SUM(CAST(cx AS DECIMAL(18,0)) * CAST(cy AS DECIMAL(18,0))) AS sxy,
         SUM(CAST(cx AS DECIMAL(18,0)) * CAST(cx AS DECIMAL(18,0))) AS sxx,
         SUM(CAST(cy AS DECIMAL(18,0)) * CAST(cy AS DECIMAL(18,0))) AS syy
  FROM lagged GROUP BY 1
)
SELECT CAST(lag AS INTEGER) AS lag_hours, n_hours,
       (CAST(n_hours AS DOUBLE) * CAST(sxy AS DOUBLE)
          - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
       / SQRT((CAST(n_hours AS DOUBLE) * CAST(sxx AS DOUBLE)
                 - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
              * (CAST(n_hours AS DOUBLE) * CAST(syy AS DOUBLE)
                 - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))) AS xcorr_r
FROM m
ORDER BY lag_hours
"""


# ---------------------------------------------------------------------------
# Inter-arrival burstiness (Goh & Barabási 2008)
# ---------------------------------------------------------------------------


def q_events_burstiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Burstiness coefficient B = (σ−μ)/(σ+μ) of inter-arrival gaps per
    event type (Goh & Barabási, EPL 2008): B→−1 for a perfectly regular
    clock, ≈0 for a Poisson process, →+1 for extreme burst clustering —
    the standard one-number diagnostic for whether traffic is machine-like
    or human-bursty (complements ``events_cusum_changepoint``, which finds
    WHEN rates shift; B says HOW arrivals cluster).

    Determinism: gaps are exact integer epoch-seconds differences (the
    multiset of gaps is invariant to equal-timestamp tie order), the two
    moments Σg and Σg² are exact DECIMAL sums, and μ, σ, B are one
    fixed-shape IEEE expression per type. Scale shape: the lag() needs a
    per-type time sort (range-partitioned at scale); moments then hash-agg
    map-side to ≤|types| rows — no raw-row shuffle after the sort.
    """
    events = load_table(spark, sf_dir, "events")
    s = F.unix_timestamp(F.col("ts")).alias("s")
    by_type = Window.partitionBy("event_type").orderBy("s", "event_id")
    gaps = (
        events.select("event_type", "event_id", s)
        .select(
            "event_type",
            (F.col("s") - F.lag("s").over(by_type)).alias("g"),
        )
        .filter(F.col("g").isNotNull())
    )
    m = gaps.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_gaps"),
        F.sum(F.col("g").cast("decimal(18,0)")).alias("sg"),
        F.sum(
            F.col("g").cast("decimal(18,0)") * F.col("g").cast("decimal(18,0)")
        ).alias("sg2"),
    )
    nd = F.col("n_gaps").cast("double")
    sgd = F.col("sg").cast("double")
    sg2d = F.col("sg2").cast("double")
    mu = sgd / nd
    sigma = F.sqrt((nd * sg2d - sgd * sgd) / (nd * nd))
    return m.select(
        "event_type",
        "n_gaps",
        mu.alias("mean_gap_s"),
        ((sigma - mu) / (sigma + mu)).alias("burstiness"),
    ).orderBy("event_type")


_ORACLE_BURSTINESS = """
WITH gaps AS (
  SELECT event_type,
         s - LAG(s) OVER (PARTITION BY event_type ORDER BY s, event_id) AS g
  FROM (SELECT event_type, event_id,
               CAST(floor(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT) AS s
        FROM events)
), m AS (
  SELECT event_type,
         CAST(COUNT(*) AS BIGINT) AS n_gaps,
         SUM(CAST(g AS DECIMAL(18,0))) AS sg,
         SUM(CAST(g AS DECIMAL(18,0)) * CAST(g AS DECIMAL(18,0))) AS sg2
  FROM gaps WHERE g IS NOT NULL GROUP BY 1
)
SELECT event_type, n_gaps,
       CAST(sg AS DOUBLE) / CAST(n_gaps AS DOUBLE) AS mean_gap_s,
       (SQRT((CAST(n_gaps AS DOUBLE) * CAST(sg2 AS DOUBLE)
                - CAST(sg AS DOUBLE) * CAST(sg AS DOUBLE))
             / (CAST(n_gaps AS DOUBLE) * CAST(n_gaps AS DOUBLE)))
          - CAST(sg AS DOUBLE) / CAST(n_gaps AS DOUBLE))
       / (SQRT((CAST(n_gaps AS DOUBLE) * CAST(sg2 AS DOUBLE)
                  - CAST(sg AS DOUBLE) * CAST(sg AS DOUBLE))
               / (CAST(n_gaps AS DOUBLE) * CAST(n_gaps AS DOUBLE)))
          + CAST(sg AS DOUBLE) / CAST(n_gaps AS DOUBLE)) AS burstiness
FROM m
ORDER BY event_type
"""


# ---------------------------------------------------------------------------
# Holiday lift vs same-weekday baseline
# ---------------------------------------------------------------------------

# Jan 2024 US holidays inside the events window, folded as EPOCH-DAY
# literals; weekday matching is integer day-index arithmetic (epoch-day
# mod 7) so both engines share one definition — SQL DOW numbering is
# engine-specific and deliberately avoided.
HOLIDAY_DAYS = [19723, 19737]          # 2024-01-01 (New Year), 2024-01-15 (MLK)
_HOLIDAY_DOW = 19723 % 7               # both fall on the same weekday (Monday)


def q_events_holiday_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holiday traffic lift per event type: holiday daily rate vs the
    SAME-WEEKDAY non-holiday baseline — the comparison every seasonal
    dashboard needs ("was New Year's Monday actually bigger than a normal
    Monday?"); naive vs-all-days baselines confound the weekday cycle
    that ``events_seasonal_hourly`` quantifies.

    Exactness: event counts and distinct-day counts are exact integers;
    lift = (h_events·b_days)/(h_days·b_events) is ONE division of two
    exact integer products. Weekday membership is epoch-day mod-7
    arithmetic on folded literals — no engine DOW function. Scale shape:
    one conditional-aggregate scan (map-side combinable) to |types| rows.
    """
    events = load_table(spark, sf_dir, "events")
    d = F.expr("CAST(unix_timestamp(ts) DIV 86400 AS BIGINT)")
    is_holiday = d.isin(HOLIDAY_DAYS)
    is_baseline = (d % 7 == F.lit(_HOLIDAY_DOW)) & ~is_holiday
    m = events.groupBy("event_type").agg(
        F.sum(is_holiday.cast("long")).cast("long").alias("holiday_events"),
        F.countDistinct(F.when(is_holiday, d)).cast("long").alias("holiday_days"),
        F.sum(is_baseline.cast("long")).cast("long").alias("baseline_events"),
        F.countDistinct(F.when(is_baseline, d)).cast("long").alias("baseline_days"),
    )
    lift = (
        (F.col("holiday_events") * F.col("baseline_days")).cast("double")
        / (F.col("holiday_days") * F.col("baseline_events")).cast("double")
    )
    return m.select(
        "event_type",
        "holiday_events",
        "holiday_days",
        "baseline_events",
        "baseline_days",
        lift.alias("holiday_lift"),
    ).orderBy("event_type")


def _sql_holiday_lift() -> str:
    days = ", ".join(str(x) for x in HOLIDAY_DAYS)
    return f"""
WITH base AS (
  SELECT event_type,
         CAST(floor(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT) // 86400 AS d
  FROM events
), m AS (
  SELECT event_type,
         CAST(SUM(CASE WHEN d IN ({days}) THEN 1 ELSE 0 END) AS BIGINT)
           AS holiday_events,
         CAST(COUNT(DISTINCT CASE WHEN d IN ({days}) THEN d END) AS BIGINT)
           AS holiday_days,
         CAST(SUM(CASE WHEN d % 7 = {_HOLIDAY_DOW} AND d NOT IN ({days})
                       THEN 1 ELSE 0 END) AS BIGINT) AS baseline_events,
         CAST(COUNT(DISTINCT CASE WHEN d % 7 = {_HOLIDAY_DOW} AND d NOT IN ({days})
                                  THEN d END) AS BIGINT) AS baseline_days
  FROM base GROUP BY 1
)
SELECT event_type, holiday_events, holiday_days, baseline_events, baseline_days,
       CAST(holiday_events * baseline_days AS DOUBLE)
         / CAST(holiday_days * baseline_events AS DOUBLE) AS holiday_lift
FROM m
ORDER BY event_type
"""


# ---------------------------------------------------------------------------
# Markov stationary distribution (integer fixed-point power iteration)
# ---------------------------------------------------------------------------

MARKOV_ITERS = 8
MARKOV_FP = 10**6  # fixed-point mass units; mass·c stays inside int64 at 100 TB


def q_events_markov_stationary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Long-run state occupancy of the user-journey Markov chain: the
    stationary distribution π of the first-order transition matrix that
    ``events_transitions`` estimates — "where do journeys spend their
    time in steady state", the summary that turns a transition heat map
    into one ranking (and the discrete cousin of ``graph_pagerank``,
    which is exactly this plus teleport).

    Determinism is total: π is carried as INTEGER fixed-point mass
    (FP = 10¹²); each power-iteration step is
    π'_j = Σ_i (π_i · c_ij) DIV c_i — pure integer multiply + FLOOR
    division (the PageRank floor-before-sum idea taken all the way: no
    doubles exist anywhere in the loop, so there is nothing to round;
    Spark `DIV` and DuckDB `//` share floor semantics on non-negative
    integers, whereas decimal division would round HALF_UP in Spark).
    {it} unrolled iterations from the uniform start; the oracle unrolls
    the same integer recurrence through MATERIALIZED CTEs (the k-core
    lesson: DuckDB re-inlines multiply-referenced CTEs ~3^rounds).

    Scale shape: ONE data-sized step (the per-user lag + (from,to) hash
    agg); the iteration runs on the |states|² matrix frame — domain-
    sized at any SF. FP = 10⁶ keeps π_i·c_ij ≤ FP·N inside int64 for
    N up to ~9·10¹² rows (past the 100 TB row count); truncation loss
    per step is < |states|/FP.
    """
    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = events.select(
        F.lag("event_type").over(w).alias("from_type"),
        F.col("event_type").alias("to_type"),
    ).filter(F.col("from_type").isNotNull())
    trans = pairs.groupBy("from_type", "to_type").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    row_tot = trans.groupBy("from_type").agg(F.sum("c").cast("long").alias("ct"))
    tmat = trans.join(row_tot, "from_type").localCheckpoint(eager=True)
    states = tmat.select(F.col("from_type").alias("state")).distinct()
    k = states.count()  # |states| is a tiny domain constant (≤ event types)
    pi = states.select(
        "state", (F.lit(MARKOV_FP) / F.lit(k)).cast("long").alias("mass")
    )
    for _ in range(MARKOV_ITERS):
        stepped = (
            pi.join(tmat, pi.state == tmat.from_type)
            .select(
                F.col("to_type").alias("state"),
                F.expr("(mass * c) DIV ct").alias("part"),
            )
            .groupBy("state")
            .agg(F.sum("part").cast("long").alias("mass"))
        )
        pi = stepped.localCheckpoint(eager=True)
    return pi.select(
        "state",
        F.col("mass").alias("pi_fp"),
        (F.col("mass").cast("double") / F.lit(float(MARKOV_FP))).alias("pi"),
    ).orderBy("state")
q_events_markov_stationary.__doc__ = q_events_markov_stationary.__doc__ and q_events_markov_stationary.__doc__.format(it=MARKOV_ITERS)


def _sql_markov() -> str:
    base = f"""
seq AS MATERIALIZED (
  SELECT lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS from_type,
         event_type AS to_type
  FROM events
),
trans AS MATERIALIZED (
  SELECT from_type, to_type, CAST(COUNT(*) AS BIGINT) AS c
  FROM seq WHERE from_type IS NOT NULL GROUP BY 1, 2
),
tmat AS MATERIALIZED (
  SELECT t.from_type, t.to_type, t.c, r.ct
  FROM trans t JOIN (SELECT from_type, CAST(SUM(c) AS BIGINT) AS ct
                     FROM trans GROUP BY 1) r
    ON t.from_type = r.from_type
),
nstates AS (SELECT CAST(COUNT(DISTINCT from_type) AS BIGINT) AS k FROM tmat),
p0 AS MATERIALIZED (
  SELECT from_type AS state, CAST({MARKOV_FP} // k AS BIGINT) AS mass
  FROM (SELECT DISTINCT from_type FROM tmat), nstates
)"""
    rounds = []
    prev = "p0"
    for i in range(1, MARKOV_ITERS + 1):
        rounds.append(f"""
p{i} AS MATERIALIZED (
  SELECT t.to_type AS state,
         CAST(SUM((p.mass * t.c) // t.ct) AS BIGINT) AS mass
  FROM {prev} p JOIN tmat t ON p.state = t.from_type
  GROUP BY 1
)""")
        prev = f"p{i}"
    return (
        "WITH "
        + base
        + ","
        + ",".join(rounds)
        + f"""
SELECT state, mass AS pi_fp,
       CAST(mass AS DOUBLE) / {float(MARKOV_FP)} AS pi
FROM {prev}
ORDER BY state
"""
    )


# ---------------------------------------------------------------------------
# Day-of-week × hour traffic heatmap
# ---------------------------------------------------------------------------

_EPOCH_MONDAY_MOD = 4  # 1970-01-01 was a Thursday ⇒ (epoch_day+4) % 7 = 0 on Mondays


def q_events_dow_hour_heatmap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-of-week × hour-of-day traffic heatmap: counts and share of
    total per (dow, hour) cell — the backing table of the canonical
    activity heatmap every analytics dashboard ships, and the 2-D view
    whose 1-D marginals are ``events_seasonal_hourly``. Weekday is
    engine-neutral integer arithmetic ((epoch_day+4) % 7, 0 = Monday —
    SQL DOW builtins disagree across engines, the holiday-lift lesson).

    Exactness: counts exact, share = one division by the window total.
    Scale shape: ONE map-side-combinable hash agg to ≤168 cells; the
    share window runs on the cell frame.
    """
    events = load_table(spark, sf_dir, "events")
    dow = (F.expr("CAST(unix_timestamp(ts) DIV 86400 AS BIGINT)") + F.lit(4)) % 7
    hour = F.expr("CAST((unix_timestamp(ts) % 86400) DIV 3600 AS INT)")
    cells = events.groupBy(
        dow.cast("int").alias("dow_monday0"), hour.alias("hour_utc")
    ).agg(F.count(F.lit(1)).cast("long").alias("n_events"))
    total = F.sum("n_events").over(Window.partitionBy()).cast("long")
    return cells.select(
        "dow_monday0",
        "hour_utc",
        "n_events",
        (F.col("n_events").cast("double") / total.cast("double")).alias("share"),
    ).orderBy("dow_monday0", "hour_utc")


_ORACLE_DOW_HEATMAP = """
WITH cells AS (
  SELECT CAST((CAST(floor(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT) // 86400 + 4) % 7
              AS INTEGER) AS dow_monday0,
         CAST((CAST(floor(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT) % 86400) // 3600
              AS INTEGER) AS hour_utc,
         CAST(COUNT(*) AS BIGINT) AS n_events
  FROM events GROUP BY 1, 2
)
SELECT dow_monday0, hour_utc, n_events,
       CAST(n_events AS DOUBLE) / CAST(SUM(n_events) OVER () AS DOUBLE) AS share
FROM cells
ORDER BY dow_monday0, hour_utc
"""


# ---------------------------------------------------------------------------
# Seasonality-adjusted anomaly detection (profile residual z-score)
# ---------------------------------------------------------------------------

RESID_Z = 3.0


def q_events_seasonal_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonality-ADJUSTED anomaly screen: flag hours whose count departs
    from their (event_type, weekday, hour-of-day) profile mean by more
    than {z}σ of the residual distribution — the alerting rung above
    ``events_zscore_anomaly`` (raw z-scores fire every rush hour;
    subtracting the weekly profile leaves only genuinely unusual hours)
    and the operational use of what ``events_seasonal_strength``
    measures.

    Determinism: cell counts and profile sums are exact integers on the
    dense spine (engine-neutral (epoch_day+4)%7 weekday); each residual
    c − Σ/n is one fixed-shape IEEE expression; the residual σ uses the
    module-standard decimal-quantized moment sums (scale 6), so the
    threshold compare is bit-stable. Scale shape: spine-compressed hash
    aggs ((type,h) → (type,dow,hod) profile → per-type σ) — everything
    after the first agg is domain-sized; the profile join is a broadcast
    (≤|types|·168 rows).
    """
    events = load_table(spark, sf_dir, "events")
    h = (F.unix_timestamp(F.col("ts")) / F.lit(3600)).cast("bigint")
    counts = events.groupBy("event_type", h.alias("h")).agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    bounds = events.agg(
        (F.min(F.unix_timestamp(F.col("ts"))) / F.lit(3600)).cast("bigint").alias("lo"),
        (F.max(F.unix_timestamp(F.col("ts"))) / F.lit(3600)).cast("bigint").alias("hi"),
    )
    types = events.select("event_type").distinct()
    spine = types.crossJoin(F.broadcast(bounds)).select(
        "event_type", F.explode(F.sequence("lo", "hi")).alias("h")
    )
    base = spine.join(counts, ["event_type", "h"], "left").select(
        "event_type",
        "h",
        F.coalesce("c", F.lit(0)).alias("c"),
        ((F.expr("h DIV 24") + F.lit(4)) % 7).cast("int").alias("dow"),
        (F.col("h") % 24).cast("int").alias("hod"),
    )
    prof = base.groupBy("event_type", "dow", "hod").agg(
        F.count(F.lit(1)).cast("long").alias("n_occ"),
        F.sum("c").cast("long").alias("s_occ"),
    )
    with_prof = base.join(F.broadcast(prof), ["event_type", "dow", "hod"])
    resid = F.col("c").cast("double") - (
        F.col("s_occ").cast("double") / F.col("n_occ").cast("double")
    )
    scored = with_prof.select("event_type", "h", "c", "n_occ", "s_occ",
                              resid.alias("r"))
    mom = scored.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        dsum("r", scale=6).alias("sr"),
        dsum(F.col("r") * F.col("r"), scale=6).alias("sr2"),
    )
    nd = F.col("n").cast("double")
    sigma = F.sqrt(
        (nd * F.col("sr2") - F.col("sr") * F.col("sr")) / (nd * nd)
    )
    return (
        scored.join(F.broadcast(mom.select("event_type", sigma.alias("sigma"))),
                    "event_type")
        .filter(F.abs(F.col("r")) > F.lit(RESID_Z) * F.col("sigma"))
        .select(
            "event_type",
            F.col("h").alias("hour_idx"),
            F.col("c").alias("n_events"),
            (F.col("s_occ").cast("double") / F.col("n_occ").cast("double")).alias(
                "expected"
            ),
            (F.col("r") / F.col("sigma")).alias("resid_z"),
        )
        .orderBy("event_type", "hour_idx")
    )
q_events_seasonal_anomaly.__doc__ = q_events_seasonal_anomaly.__doc__ and q_events_seasonal_anomaly.__doc__.format(z=int(RESID_Z))


_ORACLE_SEASONAL_ANOMALY = f"""
WITH counts AS (
  SELECT event_type,
         CAST(floor(epoch(CAST(ts AS TIMESTAMP)) / 3600) AS BIGINT) AS h,
         CAST(COUNT(*) AS BIGINT) AS c
  FROM events GROUP BY 1, 2
), bounds AS (
  SELECT CAST(floor(MIN(epoch(CAST(ts AS TIMESTAMP))) / 3600) AS BIGINT) AS lo,
         CAST(floor(MAX(epoch(CAST(ts AS TIMESTAMP))) / 3600) AS BIGINT) AS hi
  FROM events
), base AS (
  SELECT s.event_type, s.h, COALESCE(c.c, 0) AS c,
         CAST((s.h // 24 + 4) % 7 AS INTEGER) AS dow,
         CAST(s.h % 24 AS INTEGER) AS hod
  FROM (SELECT t.event_type, unnest(generate_series(lo, hi)) AS h
        FROM (SELECT DISTINCT event_type FROM events) t, bounds) s
  LEFT JOIN counts c ON s.event_type = c.event_type AND s.h = c.h
), prof AS (
  SELECT event_type, dow, hod,
         CAST(COUNT(*) AS BIGINT) AS n_occ,
         CAST(SUM(c) AS BIGINT) AS s_occ
  FROM base GROUP BY 1, 2, 3
), scored AS (
  SELECT b.event_type, b.h, b.c, p.n_occ, p.s_occ,
         CAST(b.c AS DOUBLE)
           - CAST(p.s_occ AS DOUBLE) / CAST(p.n_occ AS DOUBLE) AS r
  FROM base b JOIN prof p
    ON b.event_type = p.event_type AND b.dow = p.dow AND b.hod = p.hod
), mom AS (
  SELECT event_type,
         CAST(COUNT(*) AS BIGINT) AS n,
         {sql_dsum("r", scale=6)} AS sr,
         {sql_dsum("r * r", scale=6)} AS sr2
  FROM scored GROUP BY 1
), st AS (
  SELECT event_type,
         SQRT((CAST(n AS DOUBLE) * sr2 - sr * sr)
              / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE))) AS sigma
  FROM mom
)
SELECT s.event_type, s.h AS hour_idx, s.c AS n_events,
       CAST(s.s_occ AS DOUBLE) / CAST(s.n_occ AS DOUBLE) AS expected,
       s.r / t.sigma AS resid_z
FROM scored s JOIN st t ON s.event_type = t.event_type
WHERE ABS(s.r) > {float(RESID_Z)!r} * t.sigma
ORDER BY s.event_type, hour_idx
"""


# ---------------------------------------------------------------------------
# Hourly traffic envelope (p10/p50/p90 of daily counts per hour-of-day)
# ---------------------------------------------------------------------------


def q_events_traffic_envelope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Traffic envelope per (event type, hour-of-day): p10/p50/p90 of the
    ~30 daily observations of that hour's count — the shaded expected
    band drawn behind every live traffic line chart ("is right now
    inside the envelope?"), and the empirical-quantile companion to the
    profile-mean view in ``events_seasonal_anomaly``. Built on the dense
    spine (a silent 3am IS an observation of 0 — dropping zeros biases
    the lower band up).

    Exactness: daily counts are exact integers on the spine; the three
    band edges are RANK PICKS at ceil(q·n) (integer DIV arithmetic, ties
    broken by day — percentile_disc semantics, real data values, no
    interpolation). Scale shape: spine hash agg → per-(type,hod) rank
    windows over ~|days| rows each (24·|types| independent partitions —
    wide parallelism, tiny frames) → ≤|types|·24 output rows.
    """
    events = load_table(spark, sf_dir, "events")
    h = (F.unix_timestamp(F.col("ts")) / F.lit(3600)).cast("bigint")
    counts = events.groupBy("event_type", h.alias("h")).agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    bounds = events.agg(
        (F.min(F.unix_timestamp(F.col("ts"))) / F.lit(3600)).cast("bigint").alias("lo"),
        (F.max(F.unix_timestamp(F.col("ts"))) / F.lit(3600)).cast("bigint").alias("hi"),
    )
    types = events.select("event_type").distinct()
    spine = types.crossJoin(F.broadcast(bounds)).select(
        "event_type", F.explode(F.sequence("lo", "hi")).alias("h")
    )
    base = spine.join(counts, ["event_type", "h"], "left").select(
        "event_type",
        F.expr("h DIV 24").alias("day"),
        (F.col("h") % 24).cast("int").alias("hod"),
        F.coalesce("c", F.lit(0)).alias("c"),
    )
    w = Window.partitionBy("event_type", "hod").orderBy("c", "day")
    wn = Window.partitionBy("event_type", "hod")
    ranked = base.select(
        "event_type",
        "hod",
        "c",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(wn).cast("long").alias("n"),
    )
    return (
        ranked.groupBy("event_type", "hod")
        .agg(
            F.max("n").alias("n_days"),
            F.max(F.when(F.col("rn") == F.expr("(n + 9) DIV 10"), F.col("c"))).alias(
                "p10"
            ),
            F.max(F.when(F.col("rn") == F.expr("(n + 1) DIV 2"), F.col("c"))).alias(
                "p50"
            ),
            F.max(
                F.when(F.col("rn") == F.expr("(9 * n + 9) DIV 10"), F.col("c"))
            ).alias("p90"),
        )
        .orderBy("event_type", "hod")
    )


_ORACLE_ENVELOPE = """
WITH counts AS (
  SELECT event_type,
         CAST(floor(epoch(CAST(ts AS TIMESTAMP)) / 3600) AS BIGINT) AS h,
         CAST(COUNT(*) AS BIGINT) AS c
  FROM events GROUP BY 1, 2
), bounds AS (
  SELECT CAST(floor(MIN(epoch(CAST(ts AS TIMESTAMP))) / 3600) AS BIGINT) AS lo,
         CAST(floor(MAX(epoch(CAST(ts AS TIMESTAMP))) / 3600) AS BIGINT) AS hi
  FROM events
), base AS (
  SELECT s.event_type, s.h // 24 AS day,
         CAST(s.h % 24 AS INTEGER) AS hod,
         COALESCE(c.c, 0) AS c
  FROM (SELECT t.event_type, unnest(generate_series(lo, hi)) AS h
        FROM (SELECT DISTINCT event_type FROM events) t, bounds) s
  LEFT JOIN counts c ON s.event_type = c.event_type AND s.h = c.h
), ranked AS (
  SELECT event_type, hod, c,
         ROW_NUMBER() OVER (PARTITION BY event_type, hod ORDER BY c, day) AS rn,
         CAST(COUNT(*) OVER (PARTITION BY event_type, hod) AS BIGINT) AS n
  FROM base
)
SELECT event_type, hod,
       MAX(n) AS n_days,
       MAX(CASE WHEN rn = (n + 9) // 10 THEN c END) AS p10,
       MAX(CASE WHEN rn = (n + 1) // 2 THEN c END) AS p50,
       MAX(CASE WHEN rn = (9 * n + 9) // 10 THEN c END) AS p90
FROM ranked
GROUP BY 1, 2
ORDER BY event_type, hod
"""


# ---------------------------------------------------------------------------
# Position-based (U-shaped) multi-touch attribution
# ---------------------------------------------------------------------------

USHAPE_FIRST, USHAPE_LAST = 0.4, 0.4  # 40/20/40 position weighting


def q_events_attribution_ushaped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Position-based (U-shaped / 40-20-40) multi-touch attribution:
    within each purchase's lookback window the FIRST touch earns 40%,
    the LAST 40%, middles split the remaining 20% — the third member of
    the attribution ladder (last-touch ``events_attribution`` rewards
    closers, ``events_attribution_linear`` is positionless; U-shape is
    the standard compromise crediting discovery AND closing). Degenerate
    journeys keep total mass exactly 1: a single touch takes 100%, a
    two-touch journey splits 50/50.

    Determinism: touch position is a total-order rank ((t_ts, t_id)
    within purchase); weights are folded literals or ONE division
    (0.2/(k−2)); credit = value·w is fixed-shape IEEE; sums are
    decimal-quantized. Plan: same single user-keyed interval join as the
    linear entry, plus a per-purchase rank window on the already-
    materialized pair list — no second pass over events.
    """
    events = load_table(spark, sf_dir, "events")
    purch = events.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("event_id").alias("p_id"),
        F.col("ts").alias("p_ts"),
        "value",
    )
    touch = events.filter(F.col("event_type").isin(*ATTR_TOUCH_TYPES)).select(
        F.col("user_id").alias("t_user"),
        F.col("event_id").alias("t_id"),
        F.col("ts").alias("t_ts"),
        F.col("event_type").alias("channel"),
    )
    before = (F.col("t_ts") < F.col("p_ts")) | (
        (F.col("t_ts") == F.col("p_ts")) & (F.col("t_id") < F.col("p_id"))
    )
    pairs = purch.join(
        touch,
        (F.col("user_id") == F.col("t_user"))
        & before
        & (
            F.col("t_ts")
            >= F.col("p_ts") - F.expr(f"INTERVAL {LINEAR_LOOKBACK_HOURS} HOURS")
        ),
    )
    w_pos = Window.partitionBy("p_id").orderBy("t_ts", "t_id")
    w_n = Window.partitionBy("p_id")
    ranked = pairs.select(
        "p_id",
        "channel",
        "value",
        F.row_number().over(w_pos).alias("pos"),
        F.count(F.lit(1)).over(w_n).cast("long").alias("k"),
    )
    weight = (
        F.when(F.col("k") == 1, F.lit(1.0))
        .when((F.col("k") == 2) & (F.col("pos") == 1), F.lit(0.5))
        .when((F.col("k") == 2) & (F.col("pos") == 2), F.lit(0.5))
        .when(F.col("pos") == 1, F.lit(USHAPE_FIRST))
        .when(F.col("pos") == F.col("k"), F.lit(USHAPE_LAST))
        .otherwise(
            F.lit(1.0 - USHAPE_FIRST - USHAPE_LAST)
            / (F.col("k") - F.lit(2)).cast("double")
        )
    )
    credited = (
        ranked.withColumn("credit", F.col("value") * weight)
        .groupBy("channel")
        .agg(
            F.count(F.lit(1)).alias("n_credits"),
            dsum("credit", scale=8).alias("attributed_value"),
        )
    )
    direct = (
        purch.join(pairs.select("p_id").distinct(), "p_id", "left_anti")
        .agg(
            F.count(F.lit(1)).alias("n_credits"),
            dsum("value", scale=8).alias("attributed_value"),
        )
        .select(F.lit("direct").alias("channel"), "n_credits", "attributed_value")
    )
    return credited.unionByName(direct).orderBy("channel")


_ORACLE_ATTRIBUTION_USHAPED = f"""
WITH purch AS (
  SELECT user_id, event_id AS p_id, CAST(ts AS TIMESTAMP) AS p_ts, value
  FROM events WHERE event_type = 'purchase'
), touch AS (
  SELECT user_id AS t_user, event_id AS t_id, CAST(ts AS TIMESTAMP) AS t_ts,
         event_type AS channel
  FROM events WHERE event_type IN ('view', 'click')
), pairs AS (
  SELECT p_id, channel, value,
         ROW_NUMBER() OVER (PARTITION BY p_id ORDER BY t_ts, t_id) AS pos,
         CAST(COUNT(*) OVER (PARTITION BY p_id) AS BIGINT) AS k
  FROM purch JOIN touch
    ON user_id = t_user
   AND (t_ts < p_ts OR (t_ts = p_ts AND t_id < p_id))
   AND t_ts >= p_ts - INTERVAL {LINEAR_LOOKBACK_HOURS} HOUR
), weighted AS (
  SELECT channel,
         value * (CASE
           WHEN k = 1 THEN 1.0
           WHEN k = 2 THEN 0.5
           WHEN pos = 1 THEN {USHAPE_FIRST}
           WHEN pos = k THEN {USHAPE_LAST}
           ELSE CAST('{1.0 - USHAPE_FIRST - USHAPE_LAST!r}' AS DOUBLE) / CAST(k - 2 AS DOUBLE)
         END) AS credit
  FROM pairs
), credited AS (
  SELECT channel, COUNT(*) AS n_credits,
         {sql_dsum("credit", scale=8)} AS attributed_value
  FROM weighted GROUP BY channel
), direct AS (
  SELECT 'direct' AS channel, COUNT(*) AS n_credits,
         {sql_dsum("value", scale=8)} AS attributed_value
  FROM purch WHERE p_id NOT IN (SELECT p_id FROM pairs)
)
SELECT * FROM credited UNION ALL SELECT * FROM direct ORDER BY channel
"""


# ---------------------------------------------------------------------------
# Bot screening rule ensemble (per-user behavioral features)
# ---------------------------------------------------------------------------

BOT_MIN_EVENTS = 20           # rules only fire with enough evidence
# Thresholds sit at the ~p99 tail of THIS corpus's per-user feature
# distributions (measured: rate p50≈0.095/h p99≈0.12, dominance p50≈0.26
# p99≈0.344, burstiness p50≈-0.014 p01≈-0.123) — the synthetic users are
# organic, so a production-grade 30/h style floor would fire on nothing;
# screening thresholds are ALWAYS corpus-calibrated percentile picks, and
# the machinery (features → ordered reason codes) is what this entry gates.
BOT_RATE_PER_HOUR = 0.118     # sustained event rate threshold (~p99)
BOT_DOMINANT_SHARE = 0.335    # single-event-type obsession threshold (~p99)
BOT_REGULARITY_B = -0.122     # unusually clock-like inter-arrival pattern


def q_user_bot_screen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bot/automation screening: per-user behavioral features — event
    rate, dominant-type share, inter-arrival burstiness — fed through an
    ordered rule ensemble with reason codes, the same auditable design
    as the Gopher-style ``quality_filter_rules`` (a score without
    reasons can't be appealed or debugged; ops teams act on WHICH rule
    fired). Rules: sustained rate > {r}/h, one event type > {d:.0%} of
    activity, clock-like regularity (burstiness < {b}); all gated on
    ≥ {m} events so thin accounts can't trip them.

    Determinism: every feature reduces to exact integers (counts, epoch
    seconds, gap moments — the ``events_burstiness`` machinery per user)
    followed by fixed-shape IEEE ratios against folded literals; the
    reason string is an ordered concat of flag codes. Scale shape: one
    per-user sort window for gaps, then ONE map-side-combinable hash agg
    per user carrying all moments; output is flagged users only.
    """
    events = load_table(spark, sf_dir, "events")
    sec = F.unix_timestamp(F.col("ts"))
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    base = events.select(
        "user_id",
        "event_type",
        sec.alias("s"),
        (sec - F.unix_timestamp(F.lag("ts").over(w))).alias("g"),
    )
    # dominant-type share via a tiny (user,type) rollup → max share
    per_ut = (
        events.groupBy("user_id", "event_type")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
        .groupBy("user_id")
        .agg(F.max("c").cast("long").alias("dom_c"))
    )
    gaps = base.filter(F.col("g").isNotNull()).groupBy("user_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_gaps"),
        F.sum(F.col("g").cast("decimal(18,0)")).alias("sg"),
        F.sum(
            F.col("g").cast("decimal(18,0)") * F.col("g").cast("decimal(18,0)")
        ).alias("sg2"),
    )
    feats = (
        events.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            (F.max(sec) - F.min(sec)).cast("long").alias("span_s"),
        )
        .join(per_ut, "user_id")
        .join(gaps, "user_id", "left")
    )
    nd = F.col("n_gaps").cast("double")
    sgd, sg2d = F.col("sg").cast("double"), F.col("sg2").cast("double")
    mu = sgd / nd
    sigma = F.sqrt((nd * sg2d - sgd * sgd) / (nd * nd))
    burst = (sigma - mu) / (sigma + mu)
    rate = F.col("n_events").cast("double") / (
        F.col("span_s").cast("double") / F.lit(3600.0)
    )
    dom = F.col("dom_c").cast("double") / F.col("n_events").cast("double")
    enough = F.col("n_events") >= BOT_MIN_EVENTS
    f_rate = enough & (F.col("span_s") > 0) & (rate > F.lit(BOT_RATE_PER_HOUR))
    f_dom = enough & (dom > F.lit(BOT_DOMINANT_SHARE))
    f_reg = (
        enough
        & F.col("n_gaps").isNotNull()
        & (sigma + mu > F.lit(0.0))
        & (burst < F.lit(BOT_REGULARITY_B))
    )
    reasons = F.concat_ws(
        ",",
        F.when(f_rate, F.lit("RATE")),
        F.when(f_dom, F.lit("DOMINANT_TYPE")),
        F.when(f_reg, F.lit("CLOCKWORK")),
    )
    return (
        feats.select(
            "user_id",
            "n_events",
            "span_s",
            dom.alias("dominant_share"),
            reasons.alias("reasons"),
        )
        .filter(F.col("reasons") != "")
        .orderBy("user_id")
    )
q_user_bot_screen.__doc__ = q_user_bot_screen.__doc__ and q_user_bot_screen.__doc__.format(r=BOT_RATE_PER_HOUR, d=BOT_DOMINANT_SHARE,
               b=BOT_REGULARITY_B, m=BOT_MIN_EVENTS)


_ORACLE_BOT_SCREEN = f"""
WITH base AS (
  SELECT user_id, event_type,
         CAST(floor(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT) AS s,
         CAST(floor(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT)
           - LAG(CAST(floor(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT))
             OVER (PARTITION BY user_id ORDER BY ts, event_id) AS g
  FROM events
), per_ut AS (
  SELECT user_id, CAST(MAX(c) AS BIGINT) AS dom_c FROM (
    SELECT user_id, event_type, CAST(COUNT(*) AS BIGINT) AS c
    FROM events GROUP BY 1, 2
  ) GROUP BY 1
), gaps AS (
  SELECT user_id,
         CAST(COUNT(*) AS BIGINT) AS n_gaps,
         SUM(CAST(g AS DECIMAL(18,0))) AS sg,
         SUM(CAST(g AS DECIMAL(18,0)) * CAST(g AS DECIMAL(18,0))) AS sg2
  FROM base WHERE g IS NOT NULL GROUP BY 1
), feats AS (
  SELECT b.user_id,
         CAST(COUNT(*) AS BIGINT) AS n_events,
         CAST(MAX(s) - MIN(s) AS BIGINT) AS span_s
  FROM base b GROUP BY 1
), scored AS (
  SELECT f.user_id, f.n_events, f.span_s,
         CAST(u.dom_c AS DOUBLE) / CAST(f.n_events AS DOUBLE) AS dominant_share,
         (f.n_events >= {BOT_MIN_EVENTS}) AS enough,
         CAST(f.n_events AS DOUBLE) / (CAST(f.span_s AS DOUBLE) / 3600.0) AS rate,
         g.n_gaps,
         CAST(g.sg AS DOUBLE) / CAST(g.n_gaps AS DOUBLE) AS mu,
         SQRT((CAST(g.n_gaps AS DOUBLE) * CAST(g.sg2 AS DOUBLE)
                 - CAST(g.sg AS DOUBLE) * CAST(g.sg AS DOUBLE))
              / (CAST(g.n_gaps AS DOUBLE) * CAST(g.n_gaps AS DOUBLE))) AS sigma
  FROM feats f
  JOIN per_ut u ON f.user_id = u.user_id
  LEFT JOIN gaps g ON f.user_id = g.user_id
)
SELECT user_id, n_events, span_s, dominant_share,
       concat_ws(',',
         CASE WHEN enough AND span_s > 0
                   AND rate > {float(BOT_RATE_PER_HOUR)!r} THEN 'RATE' END,
         CASE WHEN enough AND dominant_share > {BOT_DOMINANT_SHARE!r}
              THEN 'DOMINANT_TYPE' END,
         CASE WHEN enough AND n_gaps IS NOT NULL AND sigma + mu > 0.0
                   AND (sigma - mu) / (sigma + mu) < CAST('{BOT_REGULARITY_B!r}' AS DOUBLE)
              THEN 'CLOCKWORK' END) AS reasons
FROM scored
WHERE concat_ws(',',
         CASE WHEN enough AND span_s > 0
                   AND rate > {float(BOT_RATE_PER_HOUR)!r} THEN 'RATE' END,
         CASE WHEN enough AND dominant_share > {BOT_DOMINANT_SHARE!r}
              THEN 'DOMINANT_TYPE' END,
         CASE WHEN enough AND n_gaps IS NOT NULL AND sigma + mu > 0.0
                   AND (sigma - mu) / (sigma + mu) < CAST('{BOT_REGULARITY_B!r}' AS DOUBLE)
              THEN 'CLOCKWORK' END) <> ''
ORDER BY user_id
"""


# ---------------------------------------------------------------------------
# Croston's method: intermittent-demand forecast per part
# ---------------------------------------------------------------------------

CROSTON_ALPHA = 0.25  # exactly representable in binary (the EWMA choice)
CROSTON_TOP = 20


def q_events_croston_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Croston's intermittent-demand forecast per part: two EWMAs at
    alpha={a} — one over the part's nonzero daily demand SIZES z_j, one
    over the inter-demand INTERVALS q_j (days) — and the demand-rate
    forecast z_hat/q_hat; THE standard method for sparse spare-parts
    demand where plain exponential smoothing is biased (``events_holt*``
    assume a dense series). Top {k} parts by forecast ship.

    Determinism: same contract as ``events_ewma`` — both engines fold
    the SAME value sequence (sort_array / array_agg ORDER BY day) with
    the SAME null-seeded affine recurrence, so the doubles are
    bit-identical with no quantization. Per-part state is the part's
    occurrence count (~30 at any SF — lineitem fan-in per part is flat);
    a hot part would take the events_ewma two-level chunk fold, not
    needed at this fan-in.

    Scale shape: one (part, day) hash agg, one keyed lag window for the
    gaps, one collect-fold agg per part — all partitioned by part key,
    no global windows, no collect."""
    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_partkey").alias("pk"),
        F.to_date("l_shipdate").alias("day"),
        F.round(F.col("l_quantity"), 0).cast("bigint").alias("q"),
    )
    daily = li.groupBy("pk", "day").agg(F.sum("q").cast("long").alias("z"))
    w = Window.partitionBy("pk").orderBy("day")
    occ = daily.withColumn(
        "gap", F.datediff(F.col("day"), F.lag("day").over(w)).cast("double")
    )
    per_part = occ.groupBy("pk").agg(
        F.count(F.lit(1)).cast("long").alias("n_demands"),
        F.transform(
            F.sort_array(F.collect_list(F.struct("day", F.col("z").cast("double").alias("zv")))),
            lambda s: s["zv"],
        ).alias("_zs"),
        F.transform(
            F.sort_array(
                F.collect_list(
                    F.when(F.col("gap").isNotNull(), F.struct("day", F.col("gap").alias("gv")))
                )
            ),
            lambda s: s["gv"],
        ).alias("_qs"),
    )
    a = F.lit(CROSTON_ALPHA)
    fold = lambda arr: F.aggregate(
        arr,
        F.lit(None).cast("double"),
        lambda acc, x: F.when(acc.isNull(), x).otherwise(acc + a * (x - acc)),
    )
    scored = per_part.filter(F.col("n_demands") >= 2).select(
        "pk",
        "n_demands",
        fold(F.col("_zs")).alias("z_hat"),
        fold(F.col("_qs")).alias("q_hat"),
    )
    return (
        scored.select(
            "pk",
            "n_demands",
            "z_hat",
            "q_hat",
            (F.col("z_hat") / F.col("q_hat")).alias("croston_forecast"),
        )
        .orderBy(F.desc("croston_forecast"), F.asc("pk"))
        .limit(CROSTON_TOP)
    )
q_events_croston_forecast.__doc__ = q_events_croston_forecast.__doc__ and q_events_croston_forecast.__doc__.format(a=CROSTON_ALPHA, k=CROSTON_TOP)


_ORACLE_CROSTON = f"""
WITH daily AS (
  SELECT l_partkey AS pk, CAST(l_shipdate AS DATE) AS day,
         CAST(SUM(CAST(round(l_quantity, 0) AS BIGINT)) AS BIGINT) AS z
  FROM lineitem GROUP BY 1, 2
), occ AS (
  SELECT pk, day, z,
         CAST(day - lag(day) OVER (PARTITION BY pk ORDER BY day) AS DOUBLE) AS gap
  FROM daily
), per_part AS (
  SELECT pk, CAST(COUNT(*) AS BIGINT) AS n_demands,
         array_agg(CAST(z AS DOUBLE) ORDER BY day) AS zs,
         array_agg(gap ORDER BY day) FILTER (gap IS NOT NULL) AS qs
  FROM occ GROUP BY 1
), scored AS (
  SELECT pk, n_demands,
         list_reduce(zs, (acc, x) -> acc + {CROSTON_ALPHA} * (x - acc)) AS z_hat,
         list_reduce(qs, (acc, x) -> acc + {CROSTON_ALPHA} * (x - acc)) AS q_hat
  FROM per_part WHERE n_demands >= 2
)
SELECT pk, n_demands, z_hat, q_hat, z_hat / q_hat AS croston_forecast
FROM scored
ORDER BY croston_forecast DESC, pk ASC
LIMIT {CROSTON_TOP}
"""


# ---------------------------------------------------------------------------
# Theta-method forecast (round 10): the M3-winning decomposition
# ---------------------------------------------------------------------------

THETA_ALPHA = 0.5  # SES smoothing on the theta=2 line (halving: exact IEEE)
THETA_T0 = 1992 * 12  # fixed month-index origin (ym - THETA_T0)


def q_events_theta_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theta-method one-step forecast of monthly revenue per region — the
    M3-competition-winning decomposition: split the series into the
    theta=0 line (the OLS trend, pure long-run signal) and the theta=2
    line (2x_t − trend_t, double-amplified local curvature), SES the
    theta=2 line, and average the two extrapolations. Sits above
    ``events_holt_linear``/``events_holt_winters`` in the forecasting
    ladder as the robust-default method (it won M3 against both).

    Determinism: the OLS coefficients come from exact sums (t is a small
    integer month index, x is exact cents scaled to $10M units before
    products; products fsum-quantized), so both engines fold the SAME
    theta=2 value sequence (sort_array / array_agg ORDER BY) through the
    SAME acc + α(x−acc) recurrence at α={a} — bit-identical doubles, no
    quantization of the fold itself (the croston contract). Months with
    no orders are simply absent points: OLS on (t, x) pairs needs no
    spine (the xyz_demand_class lesson — a zero-filled spine adds
    nothing but a broadcast cliff).

    Scale shape: one |region|×|month| hash agg after a broadcast dim
    join; everything downstream runs on the ~400-cell frame (per-region
    fold state ≤ ~84 values)."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderdate", "o_totalprice"
    )
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    nation = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_regionkey"
    )
    region = load_table(spark, sf_dir, "region").select("r_regionkey", "r_name")
    ym = F.year("o_orderdate") * 12 + F.month("o_orderdate")
    monthly = (
        orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("r_name", (ym - F.lit(THETA_T0)).alias("t"))
        .agg(
            F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("bigint"))
            .cast("long")
            .alias("cents")
        )
        .select(
            "r_name",
            F.col("t").cast("long").alias("t"),
            (F.col("cents").cast("double") / F.lit(1.0e9)).alias("x"),
        )
    )
    coef = monthly.groupBy("r_name").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("t").cast("long").alias("st"),
        F.sum(F.col("t") * F.col("t")).cast("long").alias("stt"),
        fsum("x", scale=10).alias("sx"),
        fsum(F.col("t").cast("double") * F.col("x"), scale=10).alias("stx"),
        F.max("t").cast("long").alias("t_max"),
    )
    nd = F.col("n").cast("double")
    b = (nd * F.col("stx") - F.col("st").cast("double") * F.col("sx")) / (
        nd * F.col("stt").cast("double")
        - F.col("st").cast("double") * F.col("st").cast("double")
    )
    a = (F.col("sx") - b * F.col("st").cast("double")) / nd
    with_coef = monthly.join(
        F.broadcast(coef.select("r_name", "n", "t_max", a.alias("a"), b.alias("b"))),
        "r_name",
    )
    theta2 = with_coef.select(
        "r_name",
        "n",
        "t_max",
        "a",
        "b",
        "t",
        (
            F.lit(2.0) * F.col("x")
            - (F.col("a") + F.col("b") * F.col("t").cast("double"))
        ).alias("th2"),
    )
    al = F.lit(THETA_ALPHA)
    folded = theta2.groupBy("r_name", "n", "t_max", "a", "b").agg(
        F.aggregate(
            F.transform(
                F.sort_array(
                    F.collect_list(F.struct("t", F.col("th2").alias("v")))
                ),
                lambda s: s["v"],
            ),
            F.lit(None).cast("double"),
            lambda acc, x: F.when(acc.isNull(), x).otherwise(acc + al * (x - acc)),
        ).alias("ses_th2")
    )
    trend_next = F.col("a") + F.col("b") * (F.col("t_max") + 1).cast("double")
    return folded.select(
        "r_name",
        F.col("n").alias("n_months"),
        (F.col("b") * F.lit(10.0)).alias("trend_slope_musd"),
        (F.col("ses_th2") * F.lit(10.0)).alias("ses_theta2_musd"),
        (
            (F.lit(0.5) * F.col("ses_th2") + F.lit(0.5) * trend_next) * F.lit(10.0)
        ).alias("theta_forecast_musd"),
    ).orderBy("r_name")
q_events_theta_forecast.__doc__ = q_events_theta_forecast.__doc__ and q_events_theta_forecast.__doc__.format(a=THETA_ALPHA)


_ORACLE_THETA_FORECAST = f"""
WITH monthly AS (
  SELECT r_name,
         CAST(YEAR(o_orderdate) * 12 + MONTH(o_orderdate) - {THETA_T0} AS BIGINT) AS t,
         CAST(CAST(SUM(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT)
              AS DOUBLE) / 1000000000.0 AS x
  FROM orders
  JOIN customer ON o_custkey = c_custkey
  JOIN nation ON c_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey
  GROUP BY 1, 2
), coef AS (
  SELECT r_name, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(t) AS BIGINT) AS st,
         CAST(SUM(t * t) AS BIGINT) AS stt,
         {sql_fsum("x", scale=10)} AS sx,
         {sql_fsum("CAST(t AS DOUBLE) * x", scale=10)} AS stx,
         CAST(MAX(t) AS BIGINT) AS t_max
  FROM monthly GROUP BY 1
), ab AS (
  SELECT r_name, n, t_max,
         (CAST(n AS DOUBLE) * stx - CAST(st AS DOUBLE) * sx)
           / (CAST(n AS DOUBLE) * CAST(stt AS DOUBLE)
              - CAST(st AS DOUBLE) * CAST(st AS DOUBLE)) AS b,
         sx, st
  FROM coef
), ab2 AS (
  SELECT r_name, n, t_max, b,
         (sx - b * CAST(st AS DOUBLE)) / CAST(n AS DOUBLE) AS a
  FROM ab
), folded AS (
  SELECT m.r_name, ab2.n, ab2.t_max, ab2.a, ab2.b,
         list_reduce(
           array_agg(2.0 * m.x - (ab2.a + ab2.b * CAST(m.t AS DOUBLE))
                     ORDER BY m.t),
           (acc, x) -> acc + {THETA_ALPHA!r} * (x - acc)) AS ses_th2
  FROM monthly m JOIN ab2 USING (r_name)
  GROUP BY 1, 2, 3, 4, 5
)
SELECT r_name, n AS n_months,
       b * 10.0 AS trend_slope_musd,
       ses_th2 * 10.0 AS ses_theta2_musd,
       (0.5 * ses_th2 + 0.5 * (a + b * CAST(t_max + 1 AS DOUBLE))) * 10.0
         AS theta_forecast_musd
FROM folded
ORDER BY r_name
"""


RMST_TAU = 720  # restriction horizon tau in lifetime-hours (30 days)


def q_survival_rmst(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Restricted mean survival time RMST(τ={tau}h) = ∫₀^τ S(t)dt over
    the ``survival_kaplan_meier`` curve — the clinically-preferred scalar
    summary when hazards are non-proportional (a median can sit past the
    window; the τ-restricted area never does). Same lifetime/censoring
    construction as the KM entry; the integral is the exact step-function
    area Σ S(tᵢ)·(min(tᵢ₊₁,τ)−tᵢ) plus the S=1 run before the first
    death.

    Determinism, zero-UDF variant: where the KM entry runs its cumulative
    product in an Arrow ``applyInPandas``, THIS entry materializes the
    (domain-sized, ≤ window-hours) step table as ONE sorted array and
    computes every prefix product with pure Catalyst higher-order
    functions — aggregate(slice(fs,1,i), 1.0, (a,x)→a·x), the identical
    left-fold the oracle replays with list_reduce(list_prepend(1.0,
    fs[1:i])) — bit-identical IEEE sequences, no quantization. The O(k²)
    slice-fold is fine because k is the distinct-death-time count
    (bounded by the observation window, NOT by data size).

    Scale shape: identical to KM — per-user min/max hash agg, one
    domain-sized cumulative window, then single-row array arithmetic."""
    events = load_table(spark, sf_dir, "events")
    s = F.unix_timestamp(F.col("ts"))
    per_user = events.groupBy("user_id").agg(
        F.min(s).alias("first_s"), F.max(s).alias("last_s")
    )
    horizon = events.agg(F.max(s).alias("max_s"))
    users = per_user.crossJoin(F.broadcast(horizon)).select(
        F.expr("(last_s - first_s) DIV 3600").alias("t"),
        (F.col("last_s") < F.col("max_s") - F.lit(KM_CENSOR_S))
        .cast("long")
        .alias("churned"),
    )
    per_t = users.groupBy("t").agg(
        F.count(F.lit(1)).cast("long").alias("cnt"),
        F.sum("churned").cast("long").alias("d"),
    )
    w_all = Window.partitionBy()
    w_prev = Window.orderBy("t").rowsBetween(Window.unboundedPreceding, -1)
    curve = per_t.select(
        "t",
        "d",
        (
            F.sum("cnt").over(w_all)
            - F.coalesce(F.sum("cnt").over(w_prev), F.lit(0))
        ).alias("n_risk"),
    ).filter((F.col("d") > 0) & (F.col("t") < RMST_TAU))
    packed = curve.agg(
        F.sort_array(
            F.collect_list(
                F.struct(
                    "t",
                    (
                        (F.col("n_risk") - F.col("d")).cast("double")
                        / F.col("n_risk").cast("double")
                    ).alias("f"),
                )
            )
        ).alias("arr")
    )
    # size(arr) = 0 guard: sequence(1, 0) is DESCENDING [1, 0] in Spark
    # (the repo's documented pitfall) and arr[0] errors under ANSI — a
    # curve with no deaths below tau means S ≡ 1, so RMST = tau exactly.
    expr = f"""
        CASE WHEN size(arr) = 0 THEN CAST({RMST_TAU} AS DOUBLE) ELSE
        aggregate(
          transform(sequence(1, size(arr)), i ->
            aggregate(slice(transform(arr, s -> s.f), 1, i),
                      CAST(1.0 AS DOUBLE), (a, x) -> a * x)
            * CAST((CASE WHEN i = size(arr) THEN {RMST_TAU}
                         ELSE arr[i].t END) - arr[i - 1].t AS DOUBLE)
          ),
          CAST(arr[0].t AS DOUBLE),
          (a, x) -> a + x
        ) END
    """
    # arr is 0-indexed in element access but slice() is 1-based; sequence
    # i runs 1..k so arr[i-1] is step i and arr[i] is step i+1 (NULL past
    # the end is replaced by the CASE's tau arm before it is ever read)
    final_s = """
        aggregate(transform(arr, s -> s.f), CAST(1.0 AS DOUBLE),
                  (a, x) -> a * x)
    """
    return packed.select(
        F.expr("size(arr)").cast("long").alias("n_steps"),
        F.lit(RMST_TAU).cast("long").alias("tau_hours"),
        F.expr(expr).alias("rmst_hours"),
        F.expr(final_s).alias("survival_at_tau"),
    )
q_survival_rmst.__doc__ = q_survival_rmst.__doc__ and q_survival_rmst.__doc__.format(
        tau=RMST_TAU
    )


_ORACLE_RMST = f"""
WITH per_user AS (
  SELECT user_id,
         CAST(floor(MIN(epoch(CAST(ts AS TIMESTAMP)))) AS BIGINT) AS first_s,
         CAST(floor(MAX(epoch(CAST(ts AS TIMESTAMP)))) AS BIGINT) AS last_s
  FROM events GROUP BY 1
), users AS (
  SELECT (last_s - first_s) // 3600 AS t,
         CASE WHEN last_s < (SELECT MAX(last_s) FROM per_user) - {KM_CENSOR_S}
              THEN 1 ELSE 0 END AS churned
  FROM per_user
), per_t AS (
  SELECT t, CAST(COUNT(*) AS BIGINT) AS cnt, CAST(SUM(churned) AS BIGINT) AS d
  FROM users GROUP BY 1
), risk AS (
  SELECT t, d,
         CAST(SUM(cnt) OVER () AS BIGINT)
           - CAST(COALESCE(SUM(cnt) OVER (ORDER BY t
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
           AS n_risk
  FROM per_t
), curve AS (
  SELECT t, CAST(n_risk - d AS DOUBLE) / CAST(n_risk AS DOUBLE) AS f
  FROM risk WHERE d > 0 AND t < {RMST_TAU}
), packed AS (
  SELECT array_agg(t ORDER BY t) AS ts, array_agg(f ORDER BY t) AS fs
  FROM curve
)
SELECT CAST(len(ts) AS BIGINT) AS n_steps,
       CAST({RMST_TAU} AS BIGINT) AS tau_hours,
       CASE WHEN len(ts) = 0 THEN CAST({RMST_TAU} AS DOUBLE) ELSE
       list_reduce(list_prepend(CAST(ts[1] AS DOUBLE),
         list_transform(range(1, len(ts) + 1), i ->
           list_reduce(list_prepend(CAST(1.0 AS DOUBLE), fs[1:i]),
                       (a, x) -> a * x)
           * CAST((CASE WHEN i = len(ts) THEN {RMST_TAU}
                        ELSE ts[i + 1] END) - ts[i] AS DOUBLE))),
         (a, x) -> a + x) END AS rmst_hours,
       list_reduce(list_prepend(CAST(1.0 AS DOUBLE), fs), (a, x) -> a * x)
         AS survival_at_tau
FROM packed
"""


PERIODOGRAM_PERIODS = [12, 24, 84, 168]  # candidate cycles in hours
# Python-precomputed cos/sin tables per (period, phase) — the LUT escape
# from the no-transcendentals policy (the HLL linear-counting trick): both
# engines JOIN the identical 288 literal doubles, neither evaluates cos().
_PG_LUT = [
    (p, ph, math.cos(2.0 * math.pi * ph / p), math.sin(2.0 * math.pi * ph / p))
    for p in PERIODOGRAM_PERIODS
    for ph in range(p)
]


def _sql_pg_lut() -> str:
    rows = ", ".join(
        f"({p}, {ph}, CAST({c!r} AS DOUBLE), CAST({s!r} AS DOUBLE))"
        for p, ph, c, s in _PG_LUT
    )
    return f"(VALUES {rows}) lut(p, ph, cosv, sinv)"


def q_events_periodogram_lut(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Periodogram of the hourly event count at {ps} candidate periods:
    spectral power P(T) = C² + S² with C = Σ xₜ·cos(2π·(t mod T)/T),
    S = Σ xₜ·sin(·) — the frequency-domain seasonality detector that
    complements ``events_seasonal_strength`` (that entry assumes THE
    period; this one ranks candidates, e.g. daily vs weekly). cos/sin
    never run at query time: phase t mod T is an integer in [0, T), so
    the whole trigonometry is a {n}-row Python-precomputed LUT both
    engines join identically (the HLL linear-counting escape). C and S
    are floor-quantized deterministic sums of count×LUT products;
    power_frac normalizes by (Σx)² so periods are comparable.

    Scale shape: the one data-sized stage is the hourly count hash agg;
    the ×{k} period explode and LUT join run on the ~10³-row hourly
    grid. fsum scale 8 keeps |Σ| exact to ~sf10; drop to scale 6 at a
    1000× deployment (addends are bounded by per-hour event
    counts)."""
    events = load_table(spark, sf_dir, "events")
    h = (F.unix_timestamp(F.col("ts")) / F.lit(3600)).cast("bigint")
    counts = events.groupBy(h.alias("h")).agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    lut = spark.createDataFrame(
        _PG_LUT, "p INT, ph INT, cosv DOUBLE, sinv DOUBLE"
    )
    arms = counts.select(
        "h",
        "c",
        F.explode(
            F.array(*[F.lit(p) for p in PERIODOGRAM_PERIODS])
        ).alias("p"),
    ).withColumn("ph", (F.col("h") % F.col("p")).cast("int"))
    joined = arms.join(F.broadcast(lut), ["p", "ph"])
    per_p = joined.groupBy("p").agg(
        fsum(F.col("c").cast("double") * F.col("cosv"), scale=8).alias("cc"),
        fsum(F.col("c").cast("double") * F.col("sinv"), scale=8).alias("ss"),
        F.sum("c").cast("long").alias("total"),
    )
    power = F.col("cc") * F.col("cc") + F.col("ss") * F.col("ss")
    tot2 = F.col("total").cast("double") * F.col("total").cast("double")
    return per_p.select(
        F.col("p").cast("int").alias("period_hours"),
        "total",
        power.alias("power"),
        (power / tot2).alias("power_frac"),
    ).orderBy("period_hours")
q_events_periodogram_lut.__doc__ = q_events_periodogram_lut.__doc__ and q_events_periodogram_lut.__doc__.format(
        ps=PERIODOGRAM_PERIODS, n=len(_PG_LUT), k=len(PERIODOGRAM_PERIODS)
    )


def _sql_periodogram() -> str:
    arms = " UNION ALL ".join(
        f"SELECT h, c, {p} AS p FROM counts" for p in PERIODOGRAM_PERIODS
    )
    return f"""
WITH counts AS (
  SELECT CAST(floor(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT) // 3600 AS h,
         CAST(COUNT(*) AS BIGINT) AS c
  FROM events GROUP BY 1
), arms AS ({arms}),
joined AS (
  SELECT a.p, a.c, lut.cosv, lut.sinv
  FROM arms a JOIN {_sql_pg_lut()} ON a.p = lut.p AND CAST(a.h % a.p AS INT) = lut.ph
), per_p AS (
  SELECT p,
         {sql_fsum("CAST(c AS DOUBLE) * cosv", scale=8)} AS cc,
         {sql_fsum("CAST(c AS DOUBLE) * sinv", scale=8)} AS ss,
         CAST(SUM(c) AS BIGINT) AS total
  FROM joined GROUP BY 1
)
SELECT CAST(p AS INTEGER) AS period_hours, total,
       cc * cc + ss * ss AS power,
       (cc * cc + ss * ss)
         / (CAST(total AS DOUBLE) * CAST(total AS DOUBLE)) AS power_frac
FROM per_p
ORDER BY period_hours
"""


# ---------------------------------------------------------------------------
# Page-Hinkley sequential drift detector (round 10 wave 6)
# ---------------------------------------------------------------------------

PH_DELTA = 0.05  # magnitude tolerance (literal design parameter)
PH_LAMBDA = 100.0  # alarm threshold on the excursion (literal)
_PH_FP = 10**8  # fixed-point scale for the cumulative PH sums


def q_events_page_hinkley(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Page-Hinkley SEQUENTIAL drift detector per event type — the
    streaming-order companion of ``events_cusum_changepoint`` (which
    locates ONE offline changepoint knowing the global mean): PH tracks
    m_t = Σ_{i≤t}(x_i − x̄_i − δ) against its running minimum and alarms
    when the excursion exceeds λ — detectable the moment it happens,
    using only the mean-so-far. Ships per type: distinct alarm count
    (threshold UP-CROSSINGS via a lag on the excursion, so a sustained
    drift counts once), the duration-weighted row count above λ under
    its honest name (n_rows_above_lambda), first alarm time, and the
    maximum excursion (how decisively drift showed).

    Determinism: the value prefix sums are exact DECIMAL window sums
    over the unique (ts, event_id) order, so every running mean x̄_i is
    one IEEE division of deterministic inputs; the PH increments are
    then FLOOR-QUANTIZED (1e−8) before the cumulative sum/min, because
    a cumulative DOUBLE window sum is a sequential fold on Spark but a
    segment tree on DuckDB — different summation trees, different last
    ulps; fixed-point decimals are associative so both engines agree
    bit-for-bit. Scale shape: two type-partitioned sequential windows
    (the inherent shape of sequential detection — parallelism is capped
    at |types|, and the K=16 probe measures 5.4× accordingly, the
    honest serial cost); at 100 TB the standard mitigation is to run
    the walk per (type, day-epoch) with boundary state carry-over, or
    in Structured Streaming where the sequential fold IS the engine's
    execution model (see ``streaming/``) + one |types|-row agg."""
    events = load_table(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    order_w = Window.partitionBy("event_type").orderBy("ts", "event_id")
    cum_w = order_w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    prefixed = events.select(
        "event_type",
        "ts",
        "event_id",
        F.col("value").cast("double").alias("x"),
        F.sum(F.col("value").cast("decimal(28,8)")).over(cum_w)
        .cast("double")
        .alias("prefix"),
        F.row_number().over(order_w).alias("i"),
    )
    c = F.col("x") - F.col("prefix") / F.col("i").cast("double") - F.lit(PH_DELTA)
    quantized = prefixed.select(
        "event_type",
        "ts",
        "event_id",
        F.floor(c * F.lit(float(_PH_FP))).cast("decimal(38,0)").alias("q"),
    )
    m = F.sum("q").over(
        Window.partitionBy("event_type")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    walked = quantized.select(
        "event_type",
        "ts",
        "event_id",
        m.alias("m"),
    )
    m_min = F.min("m").over(
        Window.partitionBy("event_type")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    exc = walked.select(
        "event_type",
        "ts",
        "event_id",
        (F.col("m") - m_min).alias("e"),
    )
    lam_fp = F.lit(int(PH_LAMBDA * _PH_FP)).cast("decimal(38,0)")
    # distinct alarm EVENTS = threshold up-crossings (lag on the excursion):
    # a sustained drift counts once, not once per row it persists (r10
    # ADVICE — n_rows_above_lambda keeps the old duration-weighted count
    # under its honest name)
    lag_e = F.lag("e").over(Window.partitionBy("event_type").orderBy("ts", "event_id"))
    crossed = exc.select(
        "event_type",
        "ts",
        "e",
        F.when(
            (F.col("e") > lam_fp) & F.coalesce(lag_e <= lam_fp, F.lit(True)),
            1,
        )
        .otherwise(0)
        .alias("up"),
    )
    return (
        crossed.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("up").cast("long").alias("n_alarms"),
            F.sum(F.when(F.col("e") > lam_fp, 1).otherwise(0))
            .cast("long")
            .alias("n_rows_above_lambda"),
            F.min(F.when(F.col("e") > lam_fp, F.col("ts"))).alias("first_alarm_ts"),
            (F.max("e").cast("double") / F.lit(float(_PH_FP))).alias(
                "max_excursion"
            ),
        )
        .orderBy("event_type")
    )


_ORACLE_PAGE_HINKLEY = f"""
WITH base AS (
  SELECT event_type, CAST(ts AS TIMESTAMP) AS ts, event_id,
         CAST(value AS DOUBLE) AS x
  FROM events WHERE ts IS NOT NULL
), prefixed AS (
  SELECT event_type, ts, event_id, x,
         CAST(SUM(CAST(x AS DECIMAL(28,8))) OVER (PARTITION BY event_type
             ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS prefix,
         ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY ts, event_id) AS i
  FROM base
), quantized AS (
  SELECT event_type, ts, event_id,
         CAST(floor((x - prefix / CAST(i AS DOUBLE) - {PH_DELTA!r}) * {float(_PH_FP)!r})
              AS DECIMAL(38,0)) AS q
  FROM prefixed
), walked AS (
  SELECT event_type, ts, event_id,
         SUM(q) OVER (PARTITION BY event_type ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS m
  FROM quantized
), exc AS (
  SELECT event_type, ts, event_id,
         m - MIN(m) OVER (PARTITION BY event_type ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS e
  FROM walked
), crossed AS (
  SELECT event_type, ts, e,
         CASE WHEN e > {int(PH_LAMBDA * _PH_FP)}
                   AND COALESCE(LAG(e) OVER (PARTITION BY event_type
                       ORDER BY ts, event_id) <= {int(PH_LAMBDA * _PH_FP)}, TRUE)
              THEN 1 ELSE 0 END AS up
  FROM exc
)
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(up) AS BIGINT) AS n_alarms,
       CAST(SUM(CASE WHEN e > {int(PH_LAMBDA * _PH_FP)} THEN 1 ELSE 0 END) AS BIGINT)
         AS n_rows_above_lambda,
       MIN(CASE WHEN e > {int(PH_LAMBDA * _PH_FP)} THEN ts END) AS first_alarm_ts,
       CAST(MAX(e) AS DOUBLE) / {float(_PH_FP)!r} AS max_excursion
FROM crossed
GROUP BY event_type
ORDER BY event_type
"""


# ---------------------------------------------------------------------------
# Pinball (quantile) loss for the seasonal-naive forecast (round 10 wave 9)
# ---------------------------------------------------------------------------

PINBALL_QQ = [50, 90]  # quantile levels ×100 (literal integer domain)


def q_forecast_pinball_loss(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pinball (quantile) loss of the seasonal-naive forecast per event
    type at the 50% and 90% levels — the metric that makes QUANTILE
    forecasts rankable (MASE/sMAPE grade point forecasts; a newsvendor-
    style service-level forecast must be graded on the asymmetric loss
    it is actually used under, and pinball is its proper scoring rule).
    The q=50 column is half the MAE (sanity-anchors against
    ``forecast_mase_smape``); q=90 charges under-forecasting 9× over.

    Exactness: daily counts are integers, so 100·loss = max(q·d,
    (q−100)·d) with d = actual − forecast is INTEGER end-to-end; the
    mean is one division. Scale shape: one additive daily hash agg (the
    only fact-sized stage), one gap-proof date-arithmetic self-join, a
    2-literal explode, and a |types|×2 agg."""
    events = load_table(spark, sf_dir, "events")
    daily = events.groupBy(F.to_date("ts").alias("day"), F.col("event_type")).agg(
        F.count(F.lit(1)).alias("actual")
    )
    season = daily.select(
        F.date_add(F.col("day"), FMASE_SEASON).alias("day"),
        "event_type",
        F.col("actual").alias("forecast"),
    )
    qs = F.array(*[F.lit(q) for q in PINBALL_QQ])
    scored = (
        daily.join(season, ["day", "event_type"])
        .select(
            "event_type",
            (F.col("actual") - F.col("forecast")).cast("long").alias("d"),
            F.explode(qs).alias("qq"),
        )
        .select(
            "event_type",
            "qq",
            F.greatest(
                F.col("qq") * F.col("d"), (F.col("qq") - 100) * F.col("d")
            ).alias("loss100"),
        )
    )
    return (
        scored.groupBy("event_type", "qq")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_eval_days"),
            F.sum("loss100").cast("long").alias("sum_loss100"),
        )
        .select(
            "event_type",
            F.col("qq").cast("int").alias("quantile_pct"),
            "n_eval_days",
            (
                F.col("sum_loss100").cast("double")
                / (F.lit(100.0) * F.col("n_eval_days").cast("double"))
            ).alias("mean_pinball_loss"),
        )
        .orderBy("event_type", "quantile_pct")
    )


_ORACLE_PINBALL = f"""
WITH daily AS (
  SELECT CAST(ts AS DATE) AS day, event_type, CAST(COUNT(*) AS BIGINT) AS actual
  FROM events WHERE ts IS NOT NULL
  GROUP BY 1, 2
), season AS (
  SELECT day + {FMASE_SEASON} AS day, event_type, actual AS forecast FROM daily
), scored AS (
  SELECT d.event_type, qq,
         GREATEST(qq * (d.actual - s.forecast),
                  (qq - 100) * (d.actual - s.forecast)) AS loss100
  FROM daily d
  JOIN season s USING (day, event_type)
  CROSS JOIN (SELECT UNNEST(ARRAY{PINBALL_QQ}) AS qq)
)
SELECT event_type,
       CAST(qq AS INT) AS quantile_pct,
       CAST(COUNT(*) AS BIGINT) AS n_eval_days,
       CAST(SUM(loss100) AS DOUBLE) / (100.0 * CAST(COUNT(*) AS DOUBLE))
         AS mean_pinball_loss
FROM scored
GROUP BY 1, 2
ORDER BY 1, 2
"""


# ---------------------------------------------------------------------------
# Forecast tracking signal (round 10 wave 9)
# ---------------------------------------------------------------------------

TS_CONTROL_LIMIT = 4.0  # the classic ±4 tracking-signal control band


def q_forecast_tracking_signal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forecast TRACKING SIGNAL per event type: TS_t = CFE_t / MAD_t
    (cumulative forecast error over cumulative mean absolute deviation)
    of the one-step naive DAILY forecast — the ops-room drift monitor
    that says a forecast has gone BIASED (persistently over or under),
    which symmetric accuracy metrics cannot see. Ships the final TS,
    the worst |TS| along the way, and the ±{lim:.0f} control-band flag
    (Brown's classic rule).

    Exactness: daily counts and errors are integers, and TS_t =
    CFE_t·t / Σ|e| is a ratio of exact integers per row — cumulative
    INTEGER window sums only, no float walk at all (contrast
    ``events_page_hinkley`` where a float walk forced fixed-point).
    Scale shape: one additive daily agg, one gap-proof date-arithmetic
    self-join, one type-partitioned cumulative window over ≤|days|
    rows per type."""
    events = load_table(spark, sf_dir, "events")
    monthly = events.groupBy(
        F.to_date("ts").alias("m"), F.col("event_type")
    ).agg(F.count(F.lit(1)).alias("actual"))
    prev = monthly.select(
        F.date_add(F.col("m"), 1).alias("m"),
        "event_type",
        F.col("actual").alias("forecast"),
    )
    scored = monthly.join(prev, ["m", "event_type"]).select(
        "event_type",
        "m",
        (F.col("actual") - F.col("forecast")).cast("long").alias("e"),
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("m")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    walked = scored.select(
        "event_type",
        "m",
        F.sum("e").over(w).cast("long").alias("cfe"),
        F.sum(F.abs(F.col("e"))).over(w).cast("long").alias("sae"),
        F.row_number()
        .over(Window.partitionBy("event_type").orderBy("m"))
        .cast("long")
        .alias("t"),
    )
    # NULL contract: until the first nonzero error MAD is 0 and TS is
    # undefined — emit NULL on both engines rather than inf/error
    ts = F.when(
        F.col("sae") > 0,
        F.col("cfe").cast("double")
        * F.col("t").cast("double")
        / F.col("sae").cast("double"),
    )
    flagged = walked.select(
        "event_type", "m", "t", ts.alias("ts_val")
    )
    w_last = Window.partitionBy("event_type").orderBy(F.col("t").desc())
    return (
        flagged.withColumn("rn", F.row_number().over(w_last))
        .groupBy("event_type")
        .agg(
            F.max("t").cast("long").alias("n_periods"),
            F.max(F.when(F.col("rn") == 1, F.col("ts_val"))).alias("final_ts"),
            F.max(F.abs(F.col("ts_val"))).alias("max_abs_ts"),
            F.max(
                (F.abs(F.col("ts_val")) > F.lit(TS_CONTROL_LIMIT)).cast("int")
            ).alias("ever_out_of_control"),
        )
        .orderBy("event_type")
    )
q_forecast_tracking_signal.__doc__ = q_forecast_tracking_signal.__doc__ and q_forecast_tracking_signal.__doc__.format(
        lim=TS_CONTROL_LIMIT
    )


_ORACLE_TRACKING_SIGNAL = f"""
WITH monthly AS (
  SELECT CAST(ts AS DATE) AS m, event_type,
         CAST(COUNT(*) AS BIGINT) AS actual
  FROM events WHERE ts IS NOT NULL
  GROUP BY 1, 2
), prev AS (
  SELECT m + 1 AS m, event_type, actual AS forecast FROM monthly
), scored AS (
  SELECT monthly.event_type, monthly.m,
         CAST(monthly.actual - prev.forecast AS BIGINT) AS e
  FROM monthly JOIN prev USING (m, event_type)
), walked AS (
  SELECT event_type, m,
         CAST(SUM(e) OVER (PARTITION BY event_type ORDER BY m
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cfe,
         CAST(SUM(ABS(e)) OVER (PARTITION BY event_type ORDER BY m
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS sae,
         CAST(ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY m) AS BIGINT) AS t
  FROM scored
), flagged AS (
  SELECT event_type, m, t,
         CASE WHEN sae > 0
              THEN CAST(cfe AS DOUBLE) * CAST(t AS DOUBLE) / CAST(sae AS DOUBLE)
         END AS ts_val,
         ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY t DESC) AS rn
  FROM walked
)
SELECT event_type,
       CAST(MAX(t) AS BIGINT) AS n_periods,
       MAX(CASE WHEN rn = 1 THEN ts_val END) AS final_ts,
       MAX(ABS(ts_val)) AS max_abs_ts,
       CAST(MAX(CASE WHEN ABS(ts_val) > {TS_CONTROL_LIMIT!r} THEN 1 ELSE 0 END) AS INT)
         AS ever_out_of_control
FROM flagged
GROUP BY 1
ORDER BY 1
"""


# ---------------------------------------------------------------------------
# Interval-union coverage (round 10 wave 15)
# ---------------------------------------------------------------------------

COVER_TTL_MIN = 30  # each event covers [ts, ts + 30 min)


def q_events_interval_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval-UNION coverage per user: each event opens a {m}-minute
    activity window; overlapping windows must count once, so the answer
    is the measure of the union — the classic sweep-line/gaps-and-
    islands hybrid (SLA uptime, machine-utilization, billable-time
    queries are all this operator). Distinct from
    ``events_activity_islands`` (day contiguity) and
    ``events_max_concurrency`` (peak overlap): this is the INTEGRAL of
    coverage. Islands form where an event's start exceeds the running
    max of all previous ends; per island, covered = max(end) − min
    (start); union = Σ islands.

    Exactness: timestamps are integer microseconds; the running max,
    island ids (cumulative integer flags) and island extents are all
    integer window arithmetic over the (ts, event_id) total order —
    no floats anywhere. Scale shape: one user-keyed sort window (the
    inherent sweep shape, fully parallel across users), one island
    agg, one user agg."""
    events = load_table(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    ttl_us = COVER_TTL_MIN * 60 * 1_000_000
    us = F.expr("timestampdiff(MICROSECOND, TIMESTAMP '1970-01-01 00:00:00', ts)")
    base = events.select(
        "user_id",
        "event_id",
        us.alias("s"),
        (us + F.lit(ttl_us)).alias("e"),
    )
    w_prev = (
        Window.partitionBy("user_id")
        .orderBy("s", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    flagged = base.select(
        "user_id",
        "s",
        "e",
        "event_id",
        F.when(F.col("s") > F.coalesce(F.max("e").over(w_prev), F.lit(-(1 << 62))), 1)
        .otherwise(0)
        .alias("new_island"),
    )
    w_cum = (
        Window.partitionBy("user_id")
        .orderBy("s", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    islands = flagged.select(
        "user_id",
        "s",
        "e",
        F.sum("new_island").over(w_cum).alias("island_id"),
    )
    per_island = islands.groupBy("user_id", "island_id").agg(
        (F.max("e") - F.min("s")).cast("long").alias("covered_us"),
        F.count(F.lit(1)).cast("long").alias("n_events"),
    )
    return (
        per_island.groupBy("user_id")
        .agg(
            F.sum("n_events").cast("long").alias("n_events"),
            F.count(F.lit(1)).cast("long").alias("n_islands"),
            F.sum("covered_us").cast("long").alias("covered_us"),
        )
        .select(
            "user_id",
            "n_events",
            "n_islands",
            (F.col("covered_us").cast("double") / F.lit(3.6e9)).alias(
                "covered_hours"
            ),
        )
        .orderBy("user_id")
    )
q_events_interval_coverage.__doc__ = q_events_interval_coverage.__doc__ and q_events_interval_coverage.__doc__.format(m=COVER_TTL_MIN)


_ORACLE_INTERVAL_COVERAGE = f"""
WITH base AS (
  SELECT user_id, event_id,
         epoch_us(CAST(ts AS TIMESTAMP)) AS s,
         epoch_us(CAST(ts AS TIMESTAMP)) + {COVER_TTL_MIN * 60 * 1_000_000} AS e
  FROM events WHERE ts IS NOT NULL
), flagged AS (
  SELECT user_id, s, e, event_id,
         CASE WHEN s > COALESCE(MAX(e) OVER (PARTITION BY user_id
               ORDER BY s, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), {-(1 << 62)})
              THEN 1 ELSE 0 END AS new_island
  FROM base
), islands AS (
  SELECT user_id, s, e,
         SUM(new_island) OVER (PARTITION BY user_id ORDER BY s, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island_id
  FROM flagged
), per_island AS (
  SELECT user_id, island_id,
         CAST(MAX(e) - MIN(s) AS BIGINT) AS covered_us,
         CAST(COUNT(*) AS BIGINT) AS n_events
  FROM islands GROUP BY 1, 2
)
SELECT user_id,
       CAST(SUM(n_events) AS BIGINT) AS n_events,
       CAST(COUNT(*) AS BIGINT) AS n_islands,
       CAST(SUM(covered_us) AS DOUBLE) / 3.6e9 AS covered_hours
FROM per_island
GROUP BY user_id
ORDER BY user_id
"""


# ---------------------------------------------------------------------------
# Half-life recency-weighted engagement score (round 10 wave 16)
# ---------------------------------------------------------------------------

HALFLIFE_DAYS = 7  # weight halves every 7 days of age


def q_events_halflife_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recency-weighted engagement score per user: Σ value · 2^(−age/h)
    with the age bucketed to whole half-lives (h = {h} days) — THE
    feature-store staple (recency-decayed activity) computed WITHOUT
    transcendentals: exponential decay with a power-of-two base and
    INTEGER bucket exponents is exact binary scaling (value / 2^w loses
    no precision), so it fits the gate contract where exp(−λt) cannot.
    The bucketing is also what production feature pipelines actually do
    (daily/weekly snapshot grids), not a compromise.

    Exactness: ages are integer microsecond buckets from the global max
    ts; weights 2^(−w) are exact binary scalings via an INTEGER SHIFT
    (no pow() — the repo's transcendental lint); ages beyond 62
    half-lives clamp to exactly 0 (below double precision of any
    realistic score); the per-user sum is decimal-quantized (dsum
    scale 8 — each addend ≤ max(value)). Scale shape: one broadcast of the 1-row max,
    one map-side-combinable hash agg."""
    events = load_table(spark, sf_dir, "events").filter(
        F.col("ts").isNotNull() & F.col("value").isNotNull()
    )
    mx = events.agg(F.max("ts").alias("gm"))
    bucket_us = HALFLIFE_DAYS * 86_400_000_000
    aged = events.crossJoin(F.broadcast(mx)).select(
        "user_id",
        "value",
        # whole half-life buckets from the exact microsecond age — a
        # single integer floor-division (day-granular diffs differ
        # between engines: Spark counts 24h periods, DuckDB counts
        # calendar boundaries)
        F.floor(
            F.expr("timestampdiff(MICROSECOND, ts, gm)") / F.lit(bucket_us)
        ).cast("long").alias("w"),
    )
    # 2^w via an integer shift (the repo bans pow()'s 1-ulp license);
    # beyond 62 half-lives (~14 months at h=7d) the weight clamps to
    # exactly 0 — below double precision of any realistic score anyway
    denom = F.expr("CAST(shiftleft(CAST(1 AS BIGINT), CAST(w AS INT)) AS DOUBLE)")
    weighted = aged.select(
        "user_id",
        F.when(F.col("w") > 62, F.lit(0.0))
        .otherwise(F.col("value").cast("double") / denom)
        .alias("wv"),
    )
    return (
        weighted.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            dsum(F.col("wv"), scale=8).alias("recency_score"),
        )
        .orderBy("user_id")
    )
q_events_halflife_score.__doc__ = q_events_halflife_score.__doc__ and q_events_halflife_score.__doc__.format(h=HALFLIFE_DAYS)


_ORACLE_HALFLIFE = f"""
WITH mx AS (
  SELECT MAX(CAST(ts AS TIMESTAMP)) AS gm FROM events WHERE ts IS NOT NULL
), aged AS (
  SELECT user_id, value,
         CAST(floor(date_diff('microseconds', CAST(ts AS TIMESTAMP), gm)
              / 604800000000) AS BIGINT) AS w
  FROM events CROSS JOIN mx
  WHERE ts IS NOT NULL AND value IS NOT NULL
)
SELECT user_id,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       {sql_dsum("CASE WHEN w > 62 THEN 0.0 ELSE CAST(value AS DOUBLE) / CAST(1::BIGINT << w AS DOUBLE) END", scale=8)} AS recency_score
FROM aged
GROUP BY user_id
ORDER BY user_id
"""


# ---------------------------------------------------------------------------
# Pettitt change-point test on the daily event count — round 11 wave
# ---------------------------------------------------------------------------


PETTITT_LN40 = 3.6888794541139363  # ln(40): the p<=0.05 threshold constant — Python literal


def q_pettitt_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pettitt change-point test on the daily global event count: WHERE
    does the level shift, without assuming when or by how much? The
    rank-based single-changepoint locator — ``events_cusum_changepoint``
    finds the break in MEAN (moment-based, outlier-sensitive); Pettitt
    is its distribution-free twin, the hydrology/climatology standard
    for "did this series break, and on what day".

    Exact-integer formulation: with DOUBLED midranks dr (2·rank +
    ties − 1 over the daily frame, the quade convention) the Pettitt
    process is U_t = Σ_{i≤t} dr_i − t·(n+1) — INTEGER for every prefix
    t (midrank mean is exactly (n+1)/2, so doubling clears the
    half). K = max_{t<n} |U_t| is an integer max; the changepoint is
    the FIRST day attaining it (deterministic min-day tiebreak).
    Significance is TRANSCENDENTAL-FREE: the asymptotic p =
    2·exp(−6K²/(n³+n²)) ≤ 0.05 test is equivalent to 6K² ≥
    ln(40)·(n³+n²), so the engines compare exact integers against a
    PYTHON-literal ln(40) and ship the ratio (k_crit_ratio ≥ 1 ⇔
    significant) instead of calling exp (banned —
    tests/test_numeric_portability.py).

    Scale shape: the scan collapses to the |days| frame; two
    domain-sized windows (rank by value, prefix by day) + a 1-row agg."""
    events = load_table(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    daily = events.groupBy(F.to_date("ts").alias("day")).agg(
        F.count(F.lit(1)).cast("long").alias("y")
    )
    w_rank = Window.orderBy("y")
    w_ties = Window.partitionBy("y")
    ranked = daily.select(
        "day",
        (F.lit(2) * F.rank().over(w_rank) + F.count(F.lit(1)).over(w_ties) - 1)
        .cast("long")
        .alias("dr"),
    )
    w_day = Window.orderBy("day")
    w_cum = w_day.rowsBetween(Window.unboundedPreceding, 0)
    n_row = daily.agg(F.count(F.lit(1)).cast("long").alias("n"))
    walked = (
        ranked.crossJoin(F.broadcast(n_row))
        .select(
            "day",
            "n",
            (
                F.sum("dr").over(w_cum)
                - F.row_number().over(w_day).cast("long") * (F.col("n") + 1)
            ).alias("u_t"),
            F.row_number().over(w_day).alias("t"),
        )
        .filter(F.col("t") < F.col("n"))
    )
    agg = walked.agg(
        F.max("n").alias("n_days"),
        F.max(F.abs(F.col("u_t"))).cast("long").alias("k_stat"),
    )
    cp = (
        walked.join(F.broadcast(agg), F.abs(F.col("u_t")) == F.col("k_stat"))
        .agg(F.min("day").alias("changepoint_day"))
    )
    out = agg.crossJoin(F.broadcast(cp))
    nd = F.col("n_days").cast("double")
    kd = F.col("k_stat").cast("double")
    ratio = (F.lit(6.0) * kd * kd) / (
        F.lit(PETTITT_LN40) * (nd * nd * nd + nd * nd)
    )
    return out.select(
        "n_days",
        "k_stat",
        "changepoint_day",
        ratio.alias("k_crit_ratio"),
        (ratio >= F.lit(1.0)).cast("int").alias("significant_5pct"),
    )


_ORACLE_PETTITT = """
WITH daily AS (
  SELECT CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day,
         CAST(COUNT(*) AS BIGINT) AS y
  FROM events WHERE ts IS NOT NULL GROUP BY 1
), nn AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n FROM daily
), ranked AS (
  SELECT day,
         CAST(2 * RANK() OVER (ORDER BY y)
              + COUNT(*) OVER (PARTITION BY y) - 1 AS BIGINT) AS dr
  FROM daily
), walked AS (
  SELECT day, n,
         SUM(dr) OVER (ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           - ROW_NUMBER() OVER (ORDER BY day) * (n + 1) AS u_t,
         ROW_NUMBER() OVER (ORDER BY day) AS t
  FROM ranked CROSS JOIN nn
), lim AS (
  SELECT * FROM walked WHERE t < n
), agg AS (
  SELECT MAX(n) AS n_days, CAST(MAX(ABS(u_t)) AS BIGINT) AS k_stat FROM lim
), cp AS (
  SELECT MIN(day) AS changepoint_day
  FROM lim JOIN agg ON ABS(u_t) = k_stat
)
SELECT n_days, k_stat, changepoint_day,
       (6.0 * CAST(k_stat AS DOUBLE) * CAST(k_stat AS DOUBLE)) / (3.6888794541139363e0 * (CAST(n_days AS DOUBLE) * CAST(n_days AS DOUBLE) * CAST(n_days AS DOUBLE) + CAST(n_days AS DOUBLE) * CAST(n_days AS DOUBLE))) AS k_crit_ratio,
       CAST(CASE WHEN (6.0 * CAST(k_stat AS DOUBLE) * CAST(k_stat AS DOUBLE)) / (3.6888794541139363e0 * (CAST(n_days AS DOUBLE) * CAST(n_days AS DOUBLE) * CAST(n_days AS DOUBLE) + CAST(n_days AS DOUBLE) * CAST(n_days AS DOUBLE))) >= 1.0
            THEN 1 ELSE 0 END AS INT) AS significant_5pct
FROM agg CROSS JOIN cp
"""


# ---------------------------------------------------------------------------
# Cox-Stuart trend test — round 11 wave
# ---------------------------------------------------------------------------

CS_Z_CRIT = 1.959964  # two-sided 5% normal critical value — literal


def q_cox_stuart_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cox-Stuart trend test on the daily event count: the sign-test
    reduction of trend detection — pair day i with day i+⌈n/2⌉ and
    count which half of the pairs rose. Maximally robust (only SIGNS of
    half-series differences enter) and assumption-free where
    ``mann_kendall_trend`` still needs the full pair lattice; the
    classic quick test, and the two share no intermediate statistics,
    so they cross-check each other on the same series.

    Exactness: n_plus / n_minus are integer counts over the ⌊n/2⌋
    disjoint pairs (ties dropped, the standard treatment — m' =
    non-tied pairs); the continuity-corrected z = (|2·n_plus − m'| −
    1)/√m' is one IEEE sequence on them, compared against the literal
    normal 5% point. Degenerate guard: m' = 0 (all pairs tied) emits
    NULL z/flag on both engines.

    Scale shape: the scan collapses to the |days| frame; one
    row_number window + one self-join on the literal ⌈n/2⌉ offset."""
    events = load_table(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    daily = events.groupBy(F.to_date("ts").alias("day")).agg(
        F.count(F.lit(1)).cast("long").alias("y")
    )
    w_day = Window.orderBy("day")
    idx = daily.select(
        F.row_number().over(w_day).cast("long").alias("t"), "y"
    )
    n_row = idx.agg(F.max("t").alias("n"))
    half = F.ceil(F.col("n").cast("double") / F.lit(2.0)).cast("long")
    a = idx.select(F.col("t").alias("ta"), F.col("y").alias("ya"))
    b = idx.select(F.col("t").alias("tb"), F.col("y").alias("yb"))
    pairs = (
        a.crossJoin(F.broadcast(n_row))
        .withColumn("half", half)
        .join(b, F.col("tb") == F.col("ta") + F.col("half"))
    )
    agg = pairs.agg(
        F.max("n").alias("n_days"),
        F.sum(F.when(F.col("yb") > F.col("ya"), 1).otherwise(0))
        .cast("long")
        .alias("n_plus"),
        F.sum(F.when(F.col("yb") < F.col("ya"), 1).otherwise(0))
        .cast("long")
        .alias("n_minus"),
    )
    m = (F.col("n_plus") + F.col("n_minus")).cast("double")
    z = (
        F.abs(F.lit(2.0) * F.col("n_plus").cast("double") - m) - F.lit(1.0)
    ) / F.sqrt(m)
    z_g = F.when(m > 0, z)
    return agg.select(
        "n_days",
        "n_plus",
        "n_minus",
        z_g.alias("z_stat"),
        F.when(m > 0, (z > F.lit(CS_Z_CRIT)).cast("int")).alias(
            "significant_5pct"
        ),
    )


_ORACLE_COX_STUART = f"""
WITH daily AS (
  SELECT CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day,
         CAST(COUNT(*) AS BIGINT) AS y
  FROM events WHERE ts IS NOT NULL GROUP BY 1
), idx AS (
  SELECT ROW_NUMBER() OVER (ORDER BY day) AS t, y FROM daily
), nn AS (
  SELECT CAST(MAX(t) AS BIGINT) AS n,
         CAST(ceil(CAST(MAX(t) AS DOUBLE) / 2.0) AS BIGINT) AS half
  FROM idx
), pairs AS (
  SELECT a.y AS ya, b.y AS yb, n
  FROM idx a CROSS JOIN nn JOIN idx b ON b.t = a.t + half
), agg AS (
  SELECT MAX(n) AS n_days,
         CAST(SUM(CASE WHEN yb > ya THEN 1 ELSE 0 END) AS BIGINT) AS n_plus,
         CAST(SUM(CASE WHEN yb < ya THEN 1 ELSE 0 END) AS BIGINT) AS n_minus
  FROM pairs
)
SELECT n_days, n_plus, n_minus,
       CASE WHEN n_plus + n_minus > 0 THEN
         (ABS(2.0 * CAST(n_plus AS DOUBLE) - CAST(n_plus + n_minus AS DOUBLE)) - 1.0)
           / sqrt(CAST(n_plus + n_minus AS DOUBLE)) END AS z_stat,
       CAST(CASE WHEN n_plus + n_minus > 0 THEN
         CASE WHEN (ABS(2.0 * CAST(n_plus AS DOUBLE) - CAST(n_plus + n_minus AS DOUBLE)) - 1.0)
              / sqrt(CAST(n_plus + n_minus AS DOUBLE)) > {CS_Z_CRIT}
              THEN 1 ELSE 0 END END AS INT) AS significant_5pct
FROM agg
"""


# ---------------------------------------------------------------------------
# Bartels rank von Neumann randomness test — round 11 wave
# ---------------------------------------------------------------------------

BARTELS_Z_CRIT = 1.959964  # two-sided 5% normal critical value — literal


def q_bartels_rank_vn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bartels rank von Neumann ratio on the daily event count: is the
    series RANDOM, or does it carry serial structure? The rank version
    of the von Neumann successive-difference test — the nonparametric
    complement of ``runs_test`` (signs only) and ``durbin_watson``
    (moment-based): RVN = Σ(r_t − r_{t+1})² / Σ(r_t − r̄)², small under
    trend/persistence, large under oscillation, 2 under randomness.

    Exact-integer formulation: with DOUBLED midranks dr the numerator
    Σ(dr_t − dr_{t+1})² and denominator Σ(dr_t − (n+1))² are both
    INTEGER sums (the midrank mean (n+1)/2 doubles to the integer
    n+1), each 4× the classic value so the 4s cancel in the ratio —
    ONE IEEE division, then z = (RVN − 2)/√Var with Bartels' EXACT
    no-ties null variance Var = 4(n−2)(5n²−2n−9)/(5n(n+1)(n−1)²)
    (one IEEE sequence on n; with ties present this is a documented
    approximation — the tie-adjusted variance has no closed form)
    against the literal normal 5% point. Degenerate guard: a
    constant series (denominator 0) emits NULL ratio/z/flag.

    Scale shape: the scan collapses to the |days| frame; one rank
    window + one lead window + a 1-row agg."""
    events = load_table(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    daily = events.groupBy(F.to_date("ts").alias("day")).agg(
        F.count(F.lit(1)).cast("long").alias("y")
    )
    w_rank = Window.orderBy("y")
    w_ties = Window.partitionBy("y")
    ranked = daily.select(
        "day",
        (F.lit(2) * F.rank().over(w_rank) + F.count(F.lit(1)).over(w_ties) - 1)
        .cast("long")
        .alias("dr"),
    )
    w_day = Window.orderBy("day")
    n_row = daily.agg(F.count(F.lit(1)).cast("long").alias("n"))
    seq = ranked.select(
        "dr", F.lead("dr").over(w_day).alias("dr_next")
    ).crossJoin(F.broadcast(n_row))
    agg = seq.agg(
        F.max("n").alias("n_days"),
        F.sum(
            F.when(
                F.col("dr_next").isNotNull(),
                (F.col("dr") - F.col("dr_next")) * (F.col("dr") - F.col("dr_next")),
            ).otherwise(0)
        )
        .cast("long")
        .alias("num4"),
        F.sum(
            (F.col("dr") - (F.col("n") + 1)) * (F.col("dr") - (F.col("n") + 1))
        )
        .cast("long")
        .alias("den4"),
    )
    rvn = F.col("num4").cast("double") / F.col("den4").cast("double")
    nd = F.col("n_days").cast("double")
    var_rvn = (
        F.lit(4.0)
        * (nd - F.lit(2.0))
        * (F.lit(5.0) * nd * nd - F.lit(2.0) * nd - F.lit(9.0))
        / (
            F.lit(5.0)
            * nd
            * (nd + F.lit(1.0))
            * (nd - F.lit(1.0))
            * (nd - F.lit(1.0))
        )
    )
    z = (rvn - F.lit(2.0)) / F.sqrt(var_rvn)
    ok = F.col("den4") > 0
    return agg.select(
        "n_days",
        "num4",
        "den4",
        F.when(ok, rvn).alias("rvn_stat"),
        F.when(ok, z).alias("z_stat"),
        F.when(ok, (F.abs(z) > F.lit(BARTELS_Z_CRIT)).cast("int")).alias(
            "significant_5pct"
        ),
    )


_ORACLE_BARTELS = f"""
WITH daily AS (
  SELECT CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day,
         CAST(COUNT(*) AS BIGINT) AS y
  FROM events WHERE ts IS NOT NULL GROUP BY 1
), nn AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n FROM daily
), ranked AS (
  SELECT day,
         CAST(2 * RANK() OVER (ORDER BY y)
              + COUNT(*) OVER (PARTITION BY y) - 1 AS BIGINT) AS dr
  FROM daily
), seq AS (
  SELECT dr, LEAD(dr) OVER (ORDER BY day) AS dr_next, n
  FROM ranked CROSS JOIN nn
), agg AS (
  SELECT MAX(n) AS n_days,
         CAST(SUM(CASE WHEN dr_next IS NOT NULL
                       THEN (dr - dr_next) * (dr - dr_next) ELSE 0 END) AS BIGINT) AS num4,
         CAST(SUM((dr - (n + 1)) * (dr - (n + 1))) AS BIGINT) AS den4
  FROM seq
)
SELECT n_days, num4, den4,
       CASE WHEN den4 > 0 THEN CAST(num4 AS DOUBLE) / CAST(den4 AS DOUBLE) END AS rvn_stat,
       CASE WHEN den4 > 0 THEN
         (CAST(num4 AS DOUBLE) / CAST(den4 AS DOUBLE) - 2.0)
           / sqrt((4.0 * (CAST(n_days AS DOUBLE) - 2.0) * (5.0 * CAST(n_days AS DOUBLE) * CAST(n_days AS DOUBLE) - 2.0 * CAST(n_days AS DOUBLE) - 9.0) / (5.0 * CAST(n_days AS DOUBLE) * (CAST(n_days AS DOUBLE) + 1.0) * (CAST(n_days AS DOUBLE) - 1.0) * (CAST(n_days AS DOUBLE) - 1.0)))) END AS z_stat,
       CAST(CASE WHEN den4 > 0 THEN
         CASE WHEN ABS((CAST(num4 AS DOUBLE) / CAST(den4 AS DOUBLE) - 2.0)
              / sqrt((4.0 * (CAST(n_days AS DOUBLE) - 2.0) * (5.0 * CAST(n_days AS DOUBLE) * CAST(n_days AS DOUBLE) - 2.0 * CAST(n_days AS DOUBLE) - 9.0) / (5.0 * CAST(n_days AS DOUBLE) * (CAST(n_days AS DOUBLE) + 1.0) * (CAST(n_days AS DOUBLE) - 1.0) * (CAST(n_days AS DOUBLE) - 1.0))))) > {BARTELS_Z_CRIT}
              THEN 1 ELSE 0 END END AS INT) AS significant_5pct
FROM agg
"""


# ---------------------------------------------------------------------------
# Hurst exponent via rescaled-range (R/S) analysis — round 11 wave
# ---------------------------------------------------------------------------

HURST_BLOCKS = [16, 32, 64, 128]  # literal block-size ladder (hours)



def q_events_hurst_rs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hurst exponent of the hourly event-count series by classic
    rescaled-range (R/S) analysis — long-range dependence in one
    number: H ≈ 0.5 memoryless, H > 0.5 persistent (bursts beget
    bursts — capacity planning must overprovision), H < 0.5
    anti-persistent. The fractal complement of ``events_burstiness``
    (single-scale) and ``acf_lags`` (fixed lags): R/S grows like m^H
    across block sizes, so the exponent reads off a 4-point log-log
    slope over the literal ladder {bl}.

    Determinism: the hourly series is ZERO-FILLED over the dense
    min..max hour spine (gaps are real zeros of a count series). Per
    block of size m, the rescaled range uses the EXACT integer bridge
    m·W_j = m·prefix_j − j·S_block (prefix sums of integer counts), so
    R = (max−min)/m and the population σ are one IEEE sequence per
    block on exact integers; blocks with σ = 0 are dropped (guard,
    both engines); per-m means are floor-quantized sums (scale 9).
    The exponent is TRANSCENDENTAL-FREE: with dyadic block sizes the
    4-point log-log OLS slope collapses to
    H = log2((rs₁₂₈/rs₁₆)³·(rs₆₄/rs₃₂))/10, and log2 is evaluated to
    24 bits by square-and-compare using only correctly-rounded IEEE
    ×/÷/compares — bit-identical across engines by spec (JVM and
    libm ln carry a 1-ulp license and DID diverge live at sf0.1; the
    repo bans them — tests/test_numeric_portability.py).

    Scale shape: the one data-sized stage is the hourly hash agg; the
    spine, the ×4 block explode, the per-block windows, and the OLS
    all run on the ~10³-row hourly grid (domain-sized). At 100 TB the
    ladder extends upward (more octaves), not the mechanics."""
    events = load_table(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    h = (F.unix_timestamp(F.col("ts")) / F.lit(3600)).cast("bigint")
    counts = events.groupBy(h.alias("h")).agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    bounds = counts.agg(
        F.min("h").alias("h0"), F.max("h").alias("h1")
    )
    spine = bounds.select(
        F.explode(F.sequence(F.col("h0"), F.col("h1"))).alias("h")
    )
    dense = (
        spine.join(counts, "h", "left")
        .select("h", F.coalesce(F.col("c"), F.lit(0)).cast("long").alias("x"))
    )
    w_t = Window.orderBy("h")
    idx = dense.select(
        (F.row_number().over(w_t) - 1).cast("long").alias("t"), "x"
    )
    arms = idx.select(
        "t",
        "x",
        F.explode(F.array(*[F.lit(m) for m in HURST_BLOCKS])).alias("m"),
    ).select(
        "m",
        F.floor(F.col("t") / F.col("m")).cast("long").alias("blk"),
        (F.col("t") % F.col("m") + 1).cast("long").alias("j"),
        "x",
    )
    w_blk = (
        Window.partitionBy("m", "blk")
        .orderBy("j")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    pref = arms.select(
        "m",
        "blk",
        "j",
        "x",
        F.sum("x").over(w_blk).alias("prefix"),
    )
    blk_tot = arms.groupBy("m", "blk").agg(
        F.count(F.lit(1)).cast("long").alias("len"),
        F.sum("x").cast("long").alias("s"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("s2"),
    )
    bridged = pref.join(blk_tot, ["m", "blk"]).select(
        "m",
        "blk",
        "len",
        "s",
        "s2",
        (F.col("m") * F.col("prefix") - F.col("j") * F.col("s")).alias("mw"),
    )
    per_block = bridged.groupBy("m", "blk").agg(
        F.max("len").alias("len"),
        F.max("s").alias("s"),
        F.max("s2").alias("s2"),
        F.max("mw").cast("long").alias("mw_max"),
        F.min("mw").cast("long").alias("mw_min"),
    )
    md = F.col("m").cast("double")
    r = (
        F.greatest(F.col("mw_max"), F.lit(0).cast("long"))
        - F.least(F.col("mw_min"), F.lit(0).cast("long"))
    ).cast("double") / md
    var_p = (
        F.col("s2").cast("double")
        - F.col("s").cast("double") * F.col("s").cast("double") / md
    ) / md
    sd = F.sqrt(var_p)
    rs = r / sd
    per_m = (
        per_block.filter((F.col("len") == F.col("m")) & (F.col("s2") * F.col("m") > F.col("s") * F.col("s")))
        .groupBy("m")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_blocks"),
            fsum(rs, scale=9).alias("rs_sum"),
        )
        .select(
            "m",
            "n_blocks",
            (F.col("rs_sum") / F.col("n_blocks").cast("double")).alias("rs_mean"),
        )
    )
    # Hurst from the dyadic ladder WITHOUT any transcendental: with
    # block sizes doubling, the 4-point log-log OLS slope collapses to
    # H = log2( (rs_128/rs_16)^3 * (rs_64/rs_32) ) / 10 (the x-spacing
    # is exactly ln 2, so the OLS weights are (-3,-1,1,3)/(10 ln 2) and
    # the ln's cancel into one log2 of a product of ratios), and log2
    # itself comes from functions/exact.with_exact_log2 — 24 fraction
    # bits of square-and-compare on only correctly-rounded IEEE
    # ×/÷/compares, bit-identical on any conforming platform BY SPEC
    # (the repo's transcendental ban). Out-of-range z yields the NULL
    # contract.
    wide = per_m.groupBy().pivot("m", HURST_BLOCKS).agg(F.first("rs_mean"))
    rs_cols = [F.col(str(m)).alias(f"rs_{m}") for m in HURST_BLOCKS]
    r41 = F.col(str(HURST_BLOCKS[3])) / F.col(str(HURST_BLOCKS[0]))
    r32 = F.col(str(HURST_BLOCKS[2])) / F.col(str(HURST_BLOCKS[1]))
    z = r41 * r41 * r41 * r32
    cur = wide.select(*rs_cols, z.alias("z"))
    logged = with_exact_log2(cur, "z", "lz", [f"rs_{m}" for m in HURST_BLOCKS])
    return logged.select(
        *[F.col(f"rs_{m}") for m in HURST_BLOCKS],
        (F.col("lz") / F.lit(10.0)).alias("hurst_exponent"),
    )


def _sql_hurst() -> str:
    log2_frag, log2_final = sql_exact_log2_ctes(
        "zed", "z", "lz", [f"rs_{m}" for m in HURST_BLOCKS]
    )
    arms = " UNION ALL ".join(f"SELECT {m} AS m" for m in HURST_BLOCKS)
    pivot_cols = ", ".join(
        f"MAX(CASE WHEN m = {m} THEN rs_mean END) AS rs_{m}" for m in HURST_BLOCKS
    )
    rs_list = ", ".join(f"rs_{m}" for m in HURST_BLOCKS)
    return f"""
WITH counts AS (
  SELECT CAST(floor(epoch(CAST(ts AS TIMESTAMP)) / 3600) AS BIGINT) AS h,
         CAST(COUNT(*) AS BIGINT) AS c
  FROM events WHERE ts IS NOT NULL GROUP BY 1
), bounds AS (
  SELECT MIN(h) AS h0, MAX(h) AS h1 FROM counts
), spine AS (
  SELECT UNNEST(range(h0, h1 + 1)) AS h FROM bounds
), dense AS (
  SELECT spine.h, CAST(COALESCE(counts.c, 0) AS BIGINT) AS x
  FROM spine LEFT JOIN counts ON spine.h = counts.h
), idx AS (
  SELECT ROW_NUMBER() OVER (ORDER BY h) - 1 AS t, x FROM dense
), arms AS (
  SELECT m, t // m AS blk, t % m + 1 AS j, x
  FROM idx CROSS JOIN ({arms})
), pref AS (
  SELECT m, blk, j, x,
         SUM(x) OVER (PARTITION BY m, blk ORDER BY j
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS prefix
  FROM arms
), blk_tot AS (
  SELECT m, blk, CAST(COUNT(*) AS BIGINT) AS len,
         CAST(SUM(x) AS BIGINT) AS s, CAST(SUM(x * x) AS BIGINT) AS s2
  FROM arms GROUP BY 1, 2
), bridged AS (
  SELECT pref.m, pref.blk, len, s, s2,
         pref.m * prefix - j * s AS mw
  FROM pref JOIN blk_tot ON pref.m = blk_tot.m AND pref.blk = blk_tot.blk
), per_block AS (
  SELECT m, blk, MAX(len) AS len, MAX(s) AS s, MAX(s2) AS s2,
         CAST(MAX(mw) AS BIGINT) AS mw_max, CAST(MIN(mw) AS BIGINT) AS mw_min
  FROM bridged GROUP BY 1, 2
), per_m AS (
  SELECT m, CAST(COUNT(*) AS BIGINT) AS n_blocks,
         {sql_fsum("(CAST(GREATEST(mw_max, 0) - LEAST(mw_min, 0) AS DOUBLE) / CAST(m AS DOUBLE)) / sqrt((CAST(s2 AS DOUBLE) - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / CAST(m AS DOUBLE)) / CAST(m AS DOUBLE))", scale=9)} AS rs_sum
  FROM per_block
  WHERE len = m AND s2 * m > s * s
  GROUP BY 1
), means AS (
  SELECT m, rs_sum / CAST(n_blocks AS DOUBLE) AS rs_mean FROM per_m
), wide AS (
  SELECT {pivot_cols} FROM means
), zed AS (
  SELECT {rs_list},
         (rs_{HURST_BLOCKS[3]} / rs_{HURST_BLOCKS[0]})
           * (rs_{HURST_BLOCKS[3]} / rs_{HURST_BLOCKS[0]})
           * (rs_{HURST_BLOCKS[3]} / rs_{HURST_BLOCKS[0]})
           * (rs_{HURST_BLOCKS[2]} / rs_{HURST_BLOCKS[1]}) AS z
  FROM wide
){log2_frag}
SELECT {rs_list}, lz / 10.0 AS hurst_exponent
FROM {log2_final}
"""


# ---------------------------------------------------------------------------
# Turning-points randomness test (round 12)
# ---------------------------------------------------------------------------

TP_Z_CRIT = 1.959964  # two-sided 5% normal critical value — literal


def q_turning_points_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kendall's turning-points test on the hourly event-count series —
    the classic quick randomness check that counts LOCAL EXTREMA: a
    random iid series turns at ~2/3 of interior points; a trending or
    over-smoothed series turns far less, an oscillating (negatively
    autocorrelated) one far more. Complements ``runs_test`` (signs
    around the median), ``bartels_rank_vn`` (rank von Neumann) and
    ``cox_stuart_trend`` (half-series signs) — four randomness tests
    with disjoint sufficient statistics on the same family of series.

    Exactness: a turning point at interior hour i is
    (y_i > y_{i−1} AND y_i > y_{i+1}) OR (y_i < y_{i−1} AND y_i <
    y_{i+1}) — pure integer comparisons (a tie with either neighbour
    is NOT a turn, the standard discrete-data treatment, identical on
    both engines by construction). T is an integer count; under H0
    E[T] = 2(n−2)/3 and Var[T] = (16n−29)/90, so z = (T − E)/√Var is
    one fixed-order IEEE expression on (T, n); the 5% flag uses the
    literal normal point. Degenerate guard: n < 3 interior-less series
    emits NULL z/flag.

    Scale shape: the scan collapses to the |hours| frame; one lag/lead
    window over it."""
    events = load_table(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    hourly = events.groupBy(F.date_trunc("hour", F.col("ts")).alias("h")).agg(
        F.count(F.lit(1)).cast("long").alias("y")
    )
    w = Window.orderBy("h")
    lagged = hourly.select(
        "y",
        F.lag("y", 1).over(w).alias("yp"),
        F.lead("y", 1).over(w).alias("yn"),
    )
    turn = (
        ((F.col("y") > F.col("yp")) & (F.col("y") > F.col("yn")))
        | ((F.col("y") < F.col("yp")) & (F.col("y") < F.col("yn")))
    ).cast("int")
    agg = lagged.agg(
        F.count(F.lit(1)).cast("long").alias("n_hours"),
        F.sum(
            F.when(F.col("yp").isNotNull() & F.col("yn").isNotNull(), turn).otherwise(
                0
            )
        )
        .cast("long")
        .alias("n_turns"),
    )
    nd = F.col("n_hours").cast("double")
    td = F.col("n_turns").cast("double")
    e_t = F.lit(2.0) * (nd - F.lit(2.0)) / F.lit(3.0)
    var_t = (F.lit(16.0) * nd - F.lit(29.0)) / F.lit(90.0)
    z = (td - e_t) / F.sqrt(var_t)
    ok = F.col("n_hours") >= 3
    return agg.select(
        "n_hours",
        "n_turns",
        F.when(ok, e_t).alias("expected_turns"),
        F.when(ok, z).alias("z_stat"),
        F.when(ok, (F.abs(z) > F.lit(TP_Z_CRIT)).cast("int")).alias(
            "significant_5pct"
        ),
    )


_ORACLE_TURNING_POINTS = f"""
WITH hourly AS (
  SELECT date_trunc('hour', ts) AS h, CAST(COUNT(*) AS BIGINT) AS y
  FROM events WHERE ts IS NOT NULL GROUP BY 1
), lagged AS (
  SELECT y, LAG(y, 1) OVER (ORDER BY h) AS yp, LEAD(y, 1) OVER (ORDER BY h) AS yn
  FROM hourly
), agg AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_hours,
         CAST(SUM(CASE WHEN yp IS NOT NULL AND yn IS NOT NULL
                        AND ((y > yp AND y > yn) OR (y < yp AND y < yn))
                  THEN 1 ELSE 0 END) AS BIGINT) AS n_turns
  FROM lagged
)
SELECT n_hours, n_turns,
       CASE WHEN n_hours >= 3
            THEN 2.0 * (CAST(n_hours AS DOUBLE) - 2.0) / 3.0 END AS expected_turns,
       CASE WHEN n_hours >= 3
            THEN (CAST(n_turns AS DOUBLE) - 2.0 * (CAST(n_hours AS DOUBLE) - 2.0) / 3.0)
                 / sqrt((16.0 * CAST(n_hours AS DOUBLE) - 29.0) / 90.0) END AS z_stat,
       CASE WHEN n_hours >= 3
            THEN CAST(ABS((CAST(n_turns AS DOUBLE) - 2.0 * (CAST(n_hours AS DOUBLE) - 2.0) / 3.0)
                 / sqrt((16.0 * CAST(n_hours AS DOUBLE) - 29.0) / 90.0)) > {TP_Z_CRIT} AS INT)
       END AS significant_5pct
FROM agg
"""


# ---------------------------------------------------------------------------
# Foster-Stuart records test (round 12)
# ---------------------------------------------------------------------------

FS_Z_CRIT = 1.959964  # two-sided 5% normal critical value — literal
FS_H_SCALE = 14  # floor-quantization scale for the 1/t harmonic terms


def q_foster_stuart_records(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Foster-Stuart records test on the daily event-count series: count
    UPPER records (a day strictly above every earlier day) and LOWER
    records; D = U − L detects trend (records pile up at one end),
    S = U + L detects variance change. The RECORD-STATISTICS view of
    trend — a different sufficient statistic from every other trend
    entry (Mann-Kendall's pair lattice, Cox-Stuart's half-pairs,
    Pettitt's rank U-process), and the one that extreme-value practice
    (record counting) actually uses.

    Exactness: records are strict integer comparisons against the
    running max/min of the PRECEDING frame (ties break no record —
    the standard discrete treatment). Under H0 (continuous iid),
    Var[D] = E[S] = 2·Σ_{{t=2..n}} 1/t = 2(H_n − 1): the harmonic sum
    is data-length-dependent, so it is computed as a floor-quantized
    exact sum (the ``fsum`` convention, scale {FS_H_SCALE}) of the
    correctly-rounded 1/t divisions — deterministic and engine-
    identical, no transcendental (this is the rational series itself,
    not ln(n)+γ). z_D = D/√(2(H_n−1)) is one IEEE expression.
    Degenerate guard: n < 2 emits NULL z/flag.

    Scale shape: the scan collapses to the |days| frame; one running
    max/min window + one 1-row reduce."""
    events = load_table(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    daily = events.groupBy(F.to_date("ts").alias("day")).agg(
        F.count(F.lit(1)).cast("long").alias("y")
    )
    w_prev = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, -1)
    w_idx = Window.orderBy("day")
    lagged = daily.select(
        "y",
        F.max("y").over(w_prev).alias("mx"),
        F.min("y").over(w_prev).alias("mn"),
        F.row_number().over(w_idx).cast("long").alias("t"),
    )
    inv_t = F.lit(1.0) / F.col("t").cast("double")
    agg = lagged.agg(
        F.count(F.lit(1)).cast("long").alias("n_days"),
        F.sum(F.when(F.col("y") > F.col("mx"), 1).otherwise(0))
        .cast("long")
        .alias("n_upper"),
        F.sum(F.when(F.col("y") < F.col("mn"), 1).otherwise(0))
        .cast("long")
        .alias("n_lower"),
        fsum(F.when(F.col("t") >= 2, inv_t).otherwise(F.lit(0.0)), scale=FS_H_SCALE)
        .alias("h_sum"),
    )
    d = (F.col("n_upper") - F.col("n_lower")).cast("double")
    s = (F.col("n_upper") + F.col("n_lower")).cast("long")
    var_d = F.lit(2.0) * F.col("h_sum")
    z = d / F.sqrt(var_d)
    ok = F.col("h_sum") > 0
    return agg.select(
        "n_days",
        "n_upper",
        "n_lower",
        s.alias("s_records"),
        F.when(ok, z).alias("z_stat"),
        F.when(ok, (F.abs(z) > F.lit(FS_Z_CRIT)).cast("int")).alias(
            "significant_5pct"
        ),
    )


_ORACLE_FOSTER_STUART = f"""
WITH daily AS (
  SELECT CAST(ts AS DATE) AS day, CAST(COUNT(*) AS BIGINT) AS y
  FROM events WHERE ts IS NOT NULL GROUP BY 1
), lagged AS (
  SELECT y,
         MAX(y) OVER (ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS mx,
         MIN(y) OVER (ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS mn,
         CAST(ROW_NUMBER() OVER (ORDER BY day) AS BIGINT) AS t
  FROM daily
), agg AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_days,
         CAST(SUM(CASE WHEN y > mx THEN 1 ELSE 0 END) AS BIGINT) AS n_upper,
         CAST(SUM(CASE WHEN y < mn THEN 1 ELSE 0 END) AS BIGINT) AS n_lower,
         {sql_fsum("CASE WHEN t >= 2 THEN 1.0 / CAST(t AS DOUBLE) ELSE 0.0 END", scale=FS_H_SCALE)} AS h_sum
  FROM lagged
)
SELECT n_days, n_upper, n_lower,
       CAST(n_upper + n_lower AS BIGINT) AS s_records,
       CASE WHEN h_sum > 0
            THEN CAST(n_upper - n_lower AS DOUBLE) / sqrt(2.0 * h_sum) END AS z_stat,
       CASE WHEN h_sum > 0
            THEN CAST(ABS(CAST(n_upper - n_lower AS DOUBLE) / sqrt(2.0 * h_sum))
                      > {FS_Z_CRIT} AS INT) END AS significant_5pct
FROM agg
"""


# ---------------------------------------------------------------------------
# Ratio-to-moving-average seasonal index (round 12)
# ---------------------------------------------------------------------------


def q_events_seasonal_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classical ratio-to-moving-average seasonal index on monthly order
    revenue — the multiplicative-decomposition primitive (the 'seasonal
    index' every ops forecast normalizes by, and the hand method behind
    X-11-style decomposition): de-trend each month by its CENTERED
    12-month moving average (half-weight end months, the standard
    even-period centering), then average the ratios by calendar month
    and normalize the twelve indices to sum to 12. Complements
    ``events_seasonal_hourly``/``events_seasonal_strength`` (additive,
    event-grain) with the multiplicative month-grain member the
    forecasting entries (holt_winters, theta) presuppose.

    Exactness: monthly revenue is the exact integer-cents sum
    (floor(price·100) per row — identical doubles floor identically);
    the centered MA numerator Σ w·rev_c (w = 1 at the ±6 ends, 2
    inside, denominator 24) is an exact integer built by a ±6
    month-offset self-join on the MONTH frame (never a float window
    fold), so each ratio r = 24·rev_c/ma_num is ONE IEEE division of
    exact integers (< 2^53 through sf100). Per-calendar-month means are
    floor-quantized exact sums (``fsum``), and the final normalization
    divides by their 12-term exact sum. Months without a complete
    13-month window are excluded (count gate), matching the textbook
    treatment.

    Scale shape: the scan collapses to the |months| frame (~84 rows);
    the self-join and windows all run on it.

    Reference analog: month_trend computes raw monthly means
    (src/app.py:149-168); this adds the de-trended seasonal profile."""
    orders = load_table(spark, sf_dir, "orders").select(
        (F.year("o_orderdate") * 12 + F.month("o_orderdate")).alias("mid"),
        F.month("o_orderdate").alias("cal_month"),
        F.floor(F.col("o_totalprice") * F.lit(100.0)).cast("long").alias("cents"),
    )
    monthly = orders.groupBy("mid", "cal_month").agg(
        F.sum("cents").cast("long").alias("rev_c")
    )
    a = monthly.select(
        F.col("mid").alias("ma_mid"),
        F.col("cal_month").alias("cal_month"),
        F.col("rev_c").alias("rev_a"),
    )
    b = monthly.select(F.col("mid").alias("mb_mid"), F.col("rev_c").alias("rev_b"))
    win = a.join(
        F.broadcast(b),
        (F.col("mb_mid") >= F.col("ma_mid") - 6)
        & (F.col("mb_mid") <= F.col("ma_mid") + 6),
    )
    wgt = F.when(F.abs(F.col("mb_mid") - F.col("ma_mid")) == 6, F.lit(1)).otherwise(
        F.lit(2)
    )
    per_m = win.groupBy("ma_mid", "cal_month", "rev_a").agg(
        F.count(F.lit(1)).cast("int").alias("n_win"),
        F.sum(wgt * F.col("rev_b")).cast("long").alias("ma_num"),
    )
    ratios = per_m.filter((F.col("n_win") == 13) & (F.col("ma_num") > 0)).select(
        "cal_month",
        (
            (F.lit(24.0) * F.col("rev_a").cast("double"))
            / F.col("ma_num").cast("double")
        ).alias("r"),
    )
    per_cal = ratios.groupBy("cal_month").agg(
        F.count(F.lit(1)).cast("long").alias("n_years"),
        (fsum("r", scale=12) / F.count(F.lit(1)).cast("double")).alias("mean_r"),
    )
    tot = per_cal.agg(fsum("mean_r", scale=12).alias("sum_r"))
    return (
        per_cal.crossJoin(F.broadcast(tot))
        .select(
            F.col("cal_month").alias("month"),
            "n_years",
            (F.lit(12.0) * F.col("mean_r") / F.col("sum_r")).alias(
                "seasonal_index"
            ),
        )
        .orderBy("month")
    )


_ORACLE_SEASONAL_INDEX = f"""
WITH monthly AS (
  SELECT CAST(EXTRACT(YEAR FROM o_orderdate) * 12 + EXTRACT(MONTH FROM o_orderdate) AS BIGINT) AS mid,
         CAST(EXTRACT(MONTH FROM o_orderdate) AS INT) AS cal_month,
         CAST(SUM(CAST(FLOOR(o_totalprice * 100.0) AS BIGINT)) AS BIGINT) AS rev_c
  FROM orders GROUP BY 1, 2
), win AS (
  SELECT a.mid AS ma_mid, a.cal_month, a.rev_c AS rev_a,
         CAST(COUNT(*) AS INT) AS n_win,
         CAST(SUM((CASE WHEN ABS(b.mid - a.mid) = 6 THEN 1 ELSE 2 END) * b.rev_c) AS BIGINT) AS ma_num
  FROM monthly a JOIN monthly b
    ON b.mid BETWEEN a.mid - 6 AND a.mid + 6
  GROUP BY 1, 2, 3
), ratios AS (
  SELECT cal_month,
         (24.0 * CAST(rev_a AS DOUBLE)) / CAST(ma_num AS DOUBLE) AS r
  FROM win WHERE n_win = 13 AND ma_num > 0
), per_cal AS (
  SELECT cal_month, CAST(COUNT(*) AS BIGINT) AS n_years,
         {sql_fsum("r", scale=12)} / CAST(COUNT(*) AS DOUBLE) AS mean_r
  FROM ratios GROUP BY 1
), tot AS (
  SELECT {sql_fsum("mean_r", scale=12)} AS sum_r FROM per_cal
)
SELECT cal_month AS month, n_years,
       12.0 * mean_r / sum_r AS seasonal_index
FROM per_cal CROSS JOIN tot
ORDER BY month
"""


# ---------------------------------------------------------------------------
# Granger causality, 1 lag (round 13)
# ---------------------------------------------------------------------------

_GRANGER_CHI2_CRIT = 3.841458820694124  # chi2(1) 5%, asymptotic F(1, n-3)


def _granger_tree() -> dict[str, str]:
    """The restricted/unrestricted OLS closed forms as ONE shared
    expression text (used verbatim by F.expr and the oracle), over
    double columns nd, syd, sld, sxd, syyd, slld, sxxd, syld, syxd,
    slxd — identical text ⇒ identical IEEE evaluation order on both
    engines."""
    br = "((nd * syld - syd * sld) / (nd * slld - sld * sld))"
    ar = f"((syd - {br} * sld) / nd)"
    rss_r = f"(syyd - {ar} * syd - {br} * syld)"
    d = (
        "(nd * (slld * sxxd - slxd * slxd)"
        " - sld * (sld * sxxd - slxd * sxd)"
        " + sxd * (sld * slxd - slld * sxd))"
    )
    da = (
        "(syd * (slld * sxxd - slxd * slxd)"
        " - sld * (syld * sxxd - slxd * syxd)"
        " + sxd * (syld * slxd - slld * syxd))"
    )
    db = (
        "(nd * (syld * sxxd - syxd * slxd)"
        " - syd * (sld * sxxd - slxd * sxd)"
        " + sxd * (sld * syxd - syld * sxd))"
    )
    dc = (
        "(nd * (slld * syxd - syld * slxd)"
        " - sld * (sld * syxd - syld * sxd)"
        " + syd * (sld * slxd - slld * sxd))"
    )
    a, b, c = f"({da} / {d})", f"({db} / {d})", f"({dc} / {d})"
    rss_u = f"(syyd - {a} * syd - {b} * syld - {c} * syxd)"
    fstat = f"(({rss_r} - {rss_u}) * (nd - 3.0) / {rss_u})"
    return {"rss_r": rss_r, "rss_u": rss_u, "c": c, "f": fstat, "det": d}


def q_granger_causality_1lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Granger causality at lag 1 on the daily event series: do
    yesterday's VIEWS improve the prediction of today's CLICKS beyond
    yesterday's clicks alone? F = ((RSS_r − RSS_u)/1)/(RSS_u/(n−3))
    comparing the AR(1) restriction clicksₜ ~ clicksₜ₋₁ against the
    unrestricted clicksₜ ~ clicksₜ₋₁ + viewsₜ₋₁ (Granger 1969) — the
    funnel-lead-indicator question every growth dashboard asks, asked
    properly. Complements ``events_cross_correlation`` (symmetric lag
    scan) with the directional regression test.

    Exactness: both counts per day are exact integers on the
    consecutive-day frame (day−1 equi-join — gap-proof); all ten
    sufficient moments (n, Σy, Σyₗ, Σxₗ, Σy², Σyₗ², Σxₗ², Σyyₗ, Σyxₗ,
    Σyₗxₗ) are exact DECIMAL(38,0) hash sums converted ONCE via the
    portable limb-split; both OLS closed forms (2×2 direct, 3×3
    Cramer) and F are a SINGLE shared expression text evaluated by
    F.expr and the oracle — identical text, identical IEEE tree,
    engine-identical doubles (the ``silver_meal`` shared-snippet
    pattern). Significance uses the asymptotic χ²(1) 5% cut
    (F(1, n−3) → χ²(1); documented approximation — exact F quantiles
    are transcendental in n). Degenerate contract: n ≤ 3, a singular
    normal matrix (det = 0), or RSS_u ≤ 0 → F/significance NULL.

    Scale shape: one fact-sized daily hash agg, one spine-sized
    equi-join, one 1-row reduce — the sufficient-statistics shape of
    ``regression_ols`` with two regressors.

    Reference analog: none (engine addition, SURVEY.md §2.7)."""
    events = load_table(spark, sf_dir, "events")
    daily = events.groupBy(F.to_date("ts").alias("day")).agg(
        F.sum((F.col("event_type") == "click").cast("long"))
        .cast("long")
        .alias("clicks"),
        F.sum((F.col("event_type") == "view").cast("long"))
        .cast("long")
        .alias("views"),
    )
    prev = daily.select(
        F.date_add("day", 1).alias("day"),
        F.col("clicks").alias("yl"),
        F.col("views").alias("xl"),
    )
    frame = daily.join(prev, "day").select(
        F.col("clicks").alias("y"), "yl", "xl"
    )

    def dec(c):
        return c.cast("decimal(38,0)")

    red = frame.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("y").cast("decimal(38,0)").alias("sy"),
        F.sum("yl").cast("decimal(38,0)").alias("sl"),
        F.sum("xl").cast("decimal(38,0)").alias("sx"),
        F.sum(dec(F.col("y")) * dec(F.col("y"))).cast("decimal(38,0)").alias("syy"),
        F.sum(dec(F.col("yl")) * dec(F.col("yl")))
        .cast("decimal(38,0)")
        .alias("sll"),
        F.sum(dec(F.col("xl")) * dec(F.col("xl")))
        .cast("decimal(38,0)")
        .alias("sxx"),
        F.sum(dec(F.col("y")) * dec(F.col("yl")))
        .cast("decimal(38,0)")
        .alias("syl"),
        F.sum(dec(F.col("y")) * dec(F.col("xl")))
        .cast("decimal(38,0)")
        .alias("syx"),
        F.sum(dec(F.col("yl")) * dec(F.col("xl")))
        .cast("decimal(38,0)")
        .alias("slx"),
    )
    doubled = red.select(
        "n",
        F.col("n").cast("double").alias("nd"),
        dec_to_double(F.col("sy")).alias("syd"),
        dec_to_double(F.col("sl")).alias("sld"),
        dec_to_double(F.col("sx")).alias("sxd"),
        dec_to_double(F.col("syy")).alias("syyd"),
        dec_to_double(F.col("sll")).alias("slld"),
        dec_to_double(F.col("sxx")).alias("sxxd"),
        dec_to_double(F.col("syl")).alias("syld"),
        dec_to_double(F.col("syx")).alias("syxd"),
        dec_to_double(F.col("slx")).alias("slxd"),
    )
    t = _granger_tree()
    ok = (
        (F.col("n") > 3)
        & (F.expr(t["det"]) != 0)
        & (F.expr(t["rss_u"]) > 0)
    )
    return doubled.select(
        "n",
        F.expr(t["rss_r"]).alias("rss_restricted"),
        F.expr(t["rss_u"]).alias("rss_unrestricted"),
        F.expr(t["c"]).alias("views_coef"),
        F.when(ok, F.expr(t["f"])).alias("f_stat"),
        F.when(
            ok, (F.expr(t["f"]) > F.lit(_GRANGER_CHI2_CRIT)).cast("int")
        ).alias("significant_5pct"),
    )


def _sql_granger() -> str:
    t = _granger_tree()
    ok = f"n > 3 AND {t['det']} <> 0 AND {t['rss_u']} > 0"
    return f"""
WITH daily AS (
  SELECT CAST(ts AS DATE) AS day,
         CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS clicks,
         CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS views
  FROM events GROUP BY 1
), frame AS (
  SELECT a.clicks AS y, p.clicks AS yl, p.views AS xl
  FROM daily a JOIN daily p ON p.day + 1 = a.day
), red AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(y) AS DECIMAL(38,0)) AS sy,
         CAST(SUM(yl) AS DECIMAL(38,0)) AS sl,
         CAST(SUM(xl) AS DECIMAL(38,0)) AS sx,
         CAST(SUM(CAST(y AS DECIMAL(38,0)) * CAST(y AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS syy,
         CAST(SUM(CAST(yl AS DECIMAL(38,0)) * CAST(yl AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS sll,
         CAST(SUM(CAST(xl AS DECIMAL(38,0)) * CAST(xl AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS sxx,
         CAST(SUM(CAST(y AS DECIMAL(38,0)) * CAST(yl AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS syl,
         CAST(SUM(CAST(y AS DECIMAL(38,0)) * CAST(xl AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS syx,
         CAST(SUM(CAST(yl AS DECIMAL(38,0)) * CAST(xl AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS slx
  FROM frame
), doubled AS (
  SELECT n, CAST(n AS DOUBLE) AS nd,
         {sql_dec_to_double('sy')} AS syd,
         {sql_dec_to_double('sl')} AS sld,
         {sql_dec_to_double('sx')} AS sxd,
         {sql_dec_to_double('syy')} AS syyd,
         {sql_dec_to_double('sll')} AS slld,
         {sql_dec_to_double('sxx')} AS sxxd,
         {sql_dec_to_double('syl')} AS syld,
         {sql_dec_to_double('syx')} AS syxd,
         {sql_dec_to_double('slx')} AS slxd
  FROM red
)
SELECT n,
       {t['rss_r']} AS rss_restricted,
       {t['rss_u']} AS rss_unrestricted,
       {t['c']} AS views_coef,
       CASE WHEN {ok} THEN {t['f']} END AS f_stat,
       CASE WHEN {ok}
            THEN CAST({t['f']} > {_GRANGER_CHI2_CRIT} AS INT) END AS significant_5pct
FROM doubled
"""


# ---------------------------------------------------------------------------
# Additive seasonal decomposition, Diebold-Mariano, rolling-origin backtest
# (round 13)
# ---------------------------------------------------------------------------

_DECOMP_PERIOD = 7  # weekly seasonality on the daily spine (odd: one MA)
_RO_FOLDS = 4  # rolling-origin fold count
_DM_Z_CRIT = 1.959963984540054


def q_seasonal_decompose_additive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classical ADDITIVE seasonal decomposition of the daily event-count
    series at weekly period: trend = centered 7-day moving average
    (period is odd, so a single MA — the textbook moving-average
    decomposition that STL generalizes), detrended = y − trend, and the
    weekday seasonal component = per-weekday mean of the detrended
    series, reported both raw and centered by the GLOBAL detrended mean
    (weighted centering — exact; the unweighted 7-value centering would
    need an ordered float reduction). ``events_seasonal_index`` gives
    the multiplicative monthly analog; this is the additive weekly one,
    and the remainder magnitude it implies is the seasonality-strength
    denominator.

    Exactness: the trend window is valid only where all 7 days exist
    (count = 7 AND max−min = 6 days inside the ±3-row frame — the
    gap-proof condition; a row-frame over a gapped spine would silently
    span non-adjacent days). The detrended value is carried as the
    exact INTEGER num7 = 7y − Σ₇y (never y − Σ/7: no float until the
    single final division); per-weekday and global means are ONE
    division of exact integers each, and the centered component is one
    IEEE subtraction of those two deterministic doubles. Weekday is
    ISO 1=Mon..7=Sun on both engines (Spark weekday()+1 / DuckDB
    isodow).

    Scale shape: one fact-sized daily hash agg; the ±3 window and all
    later stages run on the TIME-BOUNDED daily spine (≤ a few thousand
    rows regardless of fact size — the module's standard dense-spine
    justification), collapsing to a 7-row weekday frame.

    Reference analog: none (engine addition, SURVEY.md §2.7)."""
    events = load_table(spark, sf_dir, "events")
    daily = events.groupBy(F.to_date("ts").alias("day")).agg(
        F.count(F.lit(1)).cast("long").alias("y")
    )
    w7 = Window.orderBy("day").rowsBetween(-3, 3)
    framed = daily.select(
        "day",
        "y",
        F.count(F.lit(1)).over(w7).alias("_cnt"),
        F.sum("y").over(w7).cast("long").alias("_s7"),
        F.datediff(F.max("day").over(w7), F.min("day").over(w7)).alias("_span"),
    )
    valid = framed.filter((F.col("_cnt") == 7) & (F.col("_span") == 6)).select(
        "day",
        (F.lit(7) * F.col("y") - F.col("_s7")).cast("long").alias("num7"),
    )
    tot = valid.agg(
        F.sum("num7").cast("long").alias("gnum"),
        F.count(F.lit(1)).cast("long").alias("gcnt"),
    )
    per_dow = (
        valid.select(
            (F.weekday("day") + F.lit(1)).cast("int").alias("dow"), "num7"
        )
        .groupBy("dow")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_days"),
            F.sum("num7").cast("long").alias("snum"),
        )
    )
    raw = F.col("snum").cast("double") / (
        F.lit(7.0) * F.col("n_days").cast("double")
    )
    overall = F.col("gnum").cast("double") / (
        F.lit(7.0) * F.col("gcnt").cast("double")
    )
    return (
        per_dow.crossJoin(F.broadcast(tot))
        .select(
            "dow",
            "n_days",
            raw.alias("seasonal_raw"),
            overall.alias("overall_detrended_mean"),
            (raw - overall).alias("seasonal"),
        )
        .orderBy("dow")
    )


_ORACLE_SEASONAL_DECOMPOSE = """
WITH daily AS (
  SELECT CAST(ts AS DATE) AS day, CAST(COUNT(*) AS BIGINT) AS y
  FROM events GROUP BY 1
), framed AS (
  SELECT day, y,
         COUNT(*) OVER w AS _cnt,
         CAST(SUM(y) OVER w AS BIGINT) AS _s7,
         date_diff('day', MIN(day) OVER w, MAX(day) OVER w) AS _span
  FROM daily
  WINDOW w AS (ORDER BY day ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
), valid AS (
  SELECT day, CAST(7 * y - _s7 AS BIGINT) AS num7
  FROM framed WHERE _cnt = 7 AND _span = 6
), tot AS (
  SELECT CAST(SUM(num7) AS BIGINT) AS gnum, CAST(COUNT(*) AS BIGINT) AS gcnt
  FROM valid
), per_dow AS (
  SELECT CAST(isodow(day) AS INT) AS dow,
         CAST(COUNT(*) AS BIGINT) AS n_days,
         CAST(SUM(num7) AS BIGINT) AS snum
  FROM valid GROUP BY 1
)
SELECT dow, n_days,
       CAST(snum AS DOUBLE) / (7.0 * CAST(n_days AS DOUBLE)) AS seasonal_raw,
       CAST(gnum AS DOUBLE) / (7.0 * CAST(gcnt AS DOUBLE))
         AS overall_detrended_mean,
       CAST(snum AS DOUBLE) / (7.0 * CAST(n_days AS DOUBLE))
         - CAST(gnum AS DOUBLE) / (7.0 * CAST(gcnt AS DOUBLE)) AS seasonal
FROM per_dow CROSS JOIN tot
ORDER BY dow
"""


def q_diebold_mariano_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Diebold-Mariano forecast-comparison test (h = 1, squared-error
    loss) between the two baseline forecasters of the daily event-count
    series: seasonal-naive (day − 7, ``events_forecast_baseline``'s
    method) vs naive (day − 1). DM asks the question MAE tables can't:
    is the accuracy DIFFERENCE statistically significant, or noise?
    DM = d̄ / √(V̂(d̄)) with d_t = e₁ₜ² − e₂ₜ² ~ asymptotically N(0,1)
    under equal accuracy (Diebold & Mariano 1995; at h = 1 the
    long-run variance reduces to the sample variance of d).

    Exactness: both forecasts are gap-proof equi-joins (day−7 / day−1),
    evaluated on days where BOTH exist; errors and d_t = e₁² − e₂² are
    exact BIGINTs; Σd and Σd² are DECIMAL(38,0) hash sums (Σd² ≤
    n·max_count⁴ — inside DECIMAL(38,0) past 10⁸ events/day on a
    10⁴-day spine; beyond that, rescale counts to thousands first);
    DM = Σd·√n / √(n·Σd² − (Σd)²) is ONE fixed IEEE sequence through
    the portable limb-split. The better-method verdict is an exact
    integer compare of the two total squared errors (same n — no
    division needed). Degenerate contract: fewer than 2 evaluation
    days or zero variance of d → dm_stat/significance NULL under an
    explicit guard.

    Scale shape: one fact-sized daily hash agg, two spine-sized
    equi-joins, one 1-row reduce.

    Reference analog: none (engine addition, SURVEY.md §2.7)."""
    events = load_table(spark, sf_dir, "events")
    daily = events.groupBy(F.to_date("ts").alias("day")).agg(
        F.count(F.lit(1)).cast("long").alias("y")
    )
    lag7 = daily.select(
        F.date_add("day", 7).alias("day"), F.col("y").alias("f_sn")
    )
    lag1 = daily.select(
        F.date_add("day", 1).alias("day"), F.col("y").alias("f_nv")
    )
    scored = (
        daily.join(lag7, "day")
        .join(lag1, "day")
        .select(
            (F.col("y") - F.col("f_sn")).alias("e1"),
            (F.col("y") - F.col("f_nv")).alias("e2"),
        )
        .select(
            (F.col("e1") * F.col("e1")).cast("long").alias("se1"),
            (F.col("e2") * F.col("e2")).cast("long").alias("se2"),
        )
        .select(
            "se1", "se2", (F.col("se1") - F.col("se2")).cast("long").alias("d")
        )
    )

    def dec(c):
        return c.cast("decimal(38,0)")

    red = scored.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("se1").cast("decimal(38,0)").alias("ts1"),
        F.sum("se2").cast("decimal(38,0)").alias("ts2"),
        F.sum("d").cast("decimal(38,0)").alias("sd"),
        F.sum(dec(F.col("d")) * dec(F.col("d"))).cast("decimal(38,0)").alias("sd2"),
    )
    mid = red.select(
        "n",
        "ts1",
        "ts2",
        "sd",
        (dec(F.col("n")) * F.col("sd2") - F.col("sd") * F.col("sd"))
        .cast("decimal(38,0)")
        .alias("var_num"),
    )
    nd = F.col("n").cast("double")
    dm = (
        dec_to_double(F.col("sd"))
        * F.sqrt(nd)
        / F.sqrt(dec_to_double(F.col("var_num")))
    )
    ok = (F.col("n") >= 2) & (F.col("var_num") > 0)
    return mid.select(
        "n",
        (dec_to_double(F.col("ts1")) / nd).alias("mse_snaive"),
        (dec_to_double(F.col("ts2")) / nd).alias("mse_naive"),
        F.when(ok, dm).alias("dm_stat"),
        F.when(ok, (F.abs(dm) > F.lit(_DM_Z_CRIT)).cast("int")).alias(
            "significant_5pct"
        ),
        F.when(F.col("ts1") < F.col("ts2"), F.lit("seasonal_naive"))
        .when(F.col("ts1") > F.col("ts2"), F.lit("naive"))
        .otherwise(F.lit("tie"))
        .alias("better_method"),
    )


def _sql_diebold_mariano() -> str:
    dm = (
        f"({sql_dec_to_double('sd')} * sqrt(CAST(n AS DOUBLE))"
        f" / sqrt({sql_dec_to_double('var_num')}))"
    )
    return f"""
WITH daily AS (
  SELECT CAST(ts AS DATE) AS day, CAST(COUNT(*) AS BIGINT) AS y
  FROM events GROUP BY 1
), scored AS (
  SELECT CAST((a.y - s.y) * (a.y - s.y) AS BIGINT) AS se1,
         CAST((a.y - n1.y) * (a.y - n1.y) AS BIGINT) AS se2,
         CAST((a.y - s.y) * (a.y - s.y) - (a.y - n1.y) * (a.y - n1.y) AS BIGINT) AS d
  FROM daily a
  JOIN daily s ON s.day + 7 = a.day
  JOIN daily n1 ON n1.day + 1 = a.day
), red AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(se1) AS DECIMAL(38,0)) AS ts1,
         CAST(SUM(se2) AS DECIMAL(38,0)) AS ts2,
         CAST(SUM(d) AS DECIMAL(38,0)) AS sd,
         CAST(SUM(CAST(d AS DECIMAL(38,0)) * CAST(d AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS sd2
  FROM scored
), mid AS (
  SELECT n, ts1, ts2, sd,
         CAST(CAST(n AS DECIMAL(38,0)) * sd2 - sd * sd AS DECIMAL(38,0)) AS var_num
  FROM red
)
SELECT n,
       {sql_dec_to_double('ts1')} / CAST(n AS DOUBLE) AS mse_snaive,
       {sql_dec_to_double('ts2')} / CAST(n AS DOUBLE) AS mse_naive,
       CASE WHEN n >= 2 AND var_num > 0 THEN {dm} END AS dm_stat,
       CASE WHEN n >= 2 AND var_num > 0
            THEN CAST(abs({dm}) > {_DM_Z_CRIT} AS INT) END AS significant_5pct,
       CASE WHEN ts1 < ts2 THEN 'seasonal_naive'
            WHEN ts1 > ts2 THEN 'naive' ELSE 'tie' END AS better_method
FROM mid
"""


def q_forecast_rolling_origin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling-origin backtest table: the daily event-count evaluation
    days split into 4 chronological folds, with per-fold MAE of the
    seasonal-naive (day − 7) vs naive (day − 1) forecasters and an
    exact per-fold winner — the out-of-sample STABILITY view a single
    full-period MAE (``events_forecast_baseline``) hides: a method that
    wins overall but loses recent folds is regressing. (Both baselines
    need only lagged actuals, so every fold is automatically
    expanding-window-valid; the fold structure itself is the
    deliverable.)

    Exactness: fold = least(K−1, K·datediff(day, d_min) div span) is
    pure integer arithmetic on the evaluation-day range (d_min/span
    broadcast from one exact agg); absolute errors and their per-fold
    totals are exact BIGINTs; each MAE is ONE division; the winner is
    an exact integer compare of total absolute errors (equal n within
    a fold — no division). Guards: none needed — a fold exists only if
    it has rows, and n_days ≥ 1 by construction.

    Scale shape: one fact-sized daily hash agg, two spine-sized
    equi-joins, one broadcast scalar attach, one ≤4-row hash agg.

    Reference analog: none (engine addition, SURVEY.md §2.7)."""
    events = load_table(spark, sf_dir, "events")
    daily = events.groupBy(F.to_date("ts").alias("day")).agg(
        F.count(F.lit(1)).cast("long").alias("y")
    )
    lag7 = daily.select(
        F.date_add("day", 7).alias("day"), F.col("y").alias("f_sn")
    )
    lag1 = daily.select(
        F.date_add("day", 1).alias("day"), F.col("y").alias("f_nv")
    )
    scored = (
        daily.join(lag7, "day")
        .join(lag1, "day")
        .select(
            "day",
            F.abs(F.col("y") - F.col("f_sn")).cast("long").alias("ae_sn"),
            F.abs(F.col("y") - F.col("f_nv")).cast("long").alias("ae_nv"),
        )
    )
    rng = scored.agg(
        F.min("day").alias("dmin"),
        (F.datediff(F.max("day"), F.min("day")) + F.lit(1)).alias("span"),
    )
    folded = scored.crossJoin(F.broadcast(rng)).select(
        F.least(
            F.lit(_RO_FOLDS - 1),
            F.expr(f"({_RO_FOLDS} * datediff(day, dmin)) div span"),
        )
        .cast("int")
        .alias("fold"),
        "day",
        "ae_sn",
        "ae_nv",
    )
    return (
        folded.groupBy("fold")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_days"),
            F.min("day").alias("first_day"),
            F.max("day").alias("last_day"),
            F.sum("ae_sn").cast("long").alias("tae_snaive"),
            F.sum("ae_nv").cast("long").alias("tae_naive"),
            (F.sum("ae_sn").cast("double") / F.count(F.lit(1)).cast("double")).alias(
                "mae_snaive"
            ),
            (F.sum("ae_nv").cast("double") / F.count(F.lit(1)).cast("double")).alias(
                "mae_naive"
            ),
            (F.sum("ae_sn") < F.sum("ae_nv")).cast("int").alias("snaive_wins"),
        )
        .orderBy("fold")
    )


_ORACLE_ROLLING_ORIGIN = f"""
WITH daily AS (
  SELECT CAST(ts AS DATE) AS day, CAST(COUNT(*) AS BIGINT) AS y
  FROM events GROUP BY 1
), scored AS (
  SELECT a.day,
         CAST(abs(a.y - s.y) AS BIGINT) AS ae_sn,
         CAST(abs(a.y - n1.y) AS BIGINT) AS ae_nv
  FROM daily a
  JOIN daily s ON s.day + 7 = a.day
  JOIN daily n1 ON n1.day + 1 = a.day
), rng AS (
  SELECT MIN(day) AS dmin,
         date_diff('day', MIN(day), MAX(day)) + 1 AS span
  FROM scored
), folded AS (
  SELECT CAST(LEAST({_RO_FOLDS - 1},
                    ({_RO_FOLDS} * date_diff('day', dmin, day)) // span) AS INT)
           AS fold,
         day, ae_sn, ae_nv
  FROM scored CROSS JOIN rng
)
SELECT fold,
       CAST(COUNT(*) AS BIGINT) AS n_days,
       MIN(day) AS first_day,
       MAX(day) AS last_day,
       CAST(SUM(ae_sn) AS BIGINT) AS tae_snaive,
       CAST(SUM(ae_nv) AS BIGINT) AS tae_naive,
       CAST(SUM(ae_sn) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS mae_snaive,
       CAST(SUM(ae_nv) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS mae_naive,
       CAST(SUM(ae_sn) < SUM(ae_nv) AS INT) AS snaive_wins
FROM folded
GROUP BY 1
ORDER BY fold
"""


QUERIES = {
    "granger_causality_1lag": q_granger_causality_1lag,
    "seasonal_decompose_additive": q_seasonal_decompose_additive,
    "diebold_mariano_test": q_diebold_mariano_test,
    "forecast_rolling_origin": q_forecast_rolling_origin,
    "turning_points_test": q_turning_points_test,
    "foster_stuart_records": q_foster_stuart_records,
    "events_seasonal_index": q_events_seasonal_index,
    "pettitt_changepoint": q_pettitt_changepoint,
    "cox_stuart_trend": q_cox_stuart_trend,
    "bartels_rank_vn": q_bartels_rank_vn,
    "events_hurst_rs": q_events_hurst_rs,
    "events_page_hinkley": q_events_page_hinkley,
    "events_halflife_score": q_events_halflife_score,
    "events_interval_coverage": q_events_interval_coverage,
    "forecast_pinball_loss": q_forecast_pinball_loss,
    "forecast_tracking_signal": q_forecast_tracking_signal,
    "events_tumbling": q_events_tumbling,
    "survival_rmst": q_survival_rmst,
    "events_periodogram_lut": q_events_periodogram_lut,
    "events_ohlc": q_events_ohlc,
    "events_funnel": q_events_funnel,
    "events_cohort_retention": q_events_cohort_retention,
    "events_sessionize": q_events_sessionize,
    "events_sliding_avg": q_events_sliding_avg,
    "events_session_window": q_events_session_window,
    "events_gap_fill": q_events_gap_fill,
    "events_zscore_anomaly": q_events_zscore_anomaly,
    "events_transitions": q_events_transitions,
    "events_path_trigrams": q_events_path_trigrams,
    "events_activity_islands": q_events_activity_islands,
    "forecast_mase_smape": q_forecast_mase_smape,
    "events_max_concurrency": q_events_max_concurrency,
    "events_attribution": q_events_attribution,
    "events_session_funnel": q_events_session_funnel,
    "events_forecast_baseline": q_events_forecast_baseline,
    "events_wau_rolling": q_events_wau_rolling,
    "events_dau_mau": q_events_dau_mau,
    "events_activity_concentration": q_events_activity_concentration,
    "events_return_rate": q_events_return_rate,
    "events_cohort_ltv": q_events_cohort_ltv,
    "events_attribution_linear": q_events_attribution_linear,
    "events_ewma": q_events_ewma,
    "events_croston_forecast": q_events_croston_forecast,
    "events_theta_forecast": q_events_theta_forecast,
    "events_twap": q_events_twap,
    "events_cusum_changepoint": q_events_cusum_changepoint,
    "events_seasonal_hourly": q_events_seasonal_hourly,
    "events_mad_outliers": q_events_mad_outliers,
    "events_holt_linear": q_events_holt_linear,
    "events_lttb_downsample": q_events_lttb_downsample,
    "events_funnel_exclusion": q_events_funnel_exclusion,
    "events_seasonal_strength": q_events_seasonal_strength,
    "events_burstiness": q_events_burstiness,
    "events_cross_correlation": q_events_cross_correlation,
    "survival_kaplan_meier": q_survival_kaplan_meier,
    "events_peak_detection": q_events_peak_detection,
    "events_time_to_convert": q_events_time_to_convert,
    "events_interpolate_linear": q_events_interpolate_linear,
    "events_holt_winters": q_events_holt_winters,
    "events_engagement_l28": q_events_engagement_l28,
    "events_holiday_lift": q_events_holiday_lift,
    "events_markov_stationary": q_events_markov_stationary,
    "events_dow_hour_heatmap": q_events_dow_hour_heatmap,
    "events_seasonal_anomaly": q_events_seasonal_anomaly,
    "events_traffic_envelope": q_events_traffic_envelope,
    "events_attribution_ushaped": q_events_attribution_ushaped,
    "user_bot_screen": q_user_bot_screen,
}

ORACLE = {
    "granger_causality_1lag": _sql_granger(),
    "seasonal_decompose_additive": _ORACLE_SEASONAL_DECOMPOSE,
    "diebold_mariano_test": _sql_diebold_mariano(),
    "forecast_rolling_origin": _ORACLE_ROLLING_ORIGIN,
    "turning_points_test": _ORACLE_TURNING_POINTS,
    "foster_stuart_records": _ORACLE_FOSTER_STUART,
    "events_seasonal_index": _ORACLE_SEASONAL_INDEX,
    "pettitt_changepoint": _ORACLE_PETTITT,
    "cox_stuart_trend": _ORACLE_COX_STUART,
    "bartels_rank_vn": _ORACLE_BARTELS,
    "events_hurst_rs": _sql_hurst(),
    "events_page_hinkley": _ORACLE_PAGE_HINKLEY,
    "events_interval_coverage": _ORACLE_INTERVAL_COVERAGE,
    "events_halflife_score": _ORACLE_HALFLIFE,
    "forecast_pinball_loss": _ORACLE_PINBALL,
    "forecast_tracking_signal": _ORACLE_TRACKING_SIGNAL,
    "events_tumbling": _ORACLE_EVENTS_TUMBLING,
    "events_ohlc": _ORACLE_EVENTS_OHLC,
    "events_funnel": _ORACLE_EVENTS_FUNNEL,
    "events_cohort_retention": _ORACLE_EVENTS_COHORT_RETENTION,
    "events_sessionize": _ORACLE_EVENTS_SESSIONIZE,
    "events_sliding_avg": _ORACLE_EVENTS_SLIDING,
    "events_session_window": _ORACLE_EVENTS_SESSION_WINDOW,
    "events_gap_fill": _ORACLE_EVENTS_GAP_FILL,
    "events_zscore_anomaly": _ORACLE_EVENTS_ZSCORE,
    "events_transitions": _ORACLE_EVENTS_TRANSITIONS,
    "events_path_trigrams": _ORACLE_EVENTS_PATH_TRIGRAMS,
    "events_activity_islands": _ORACLE_ACTIVITY_ISLANDS,
    "forecast_mase_smape": _ORACLE_FORECAST_MASE,
    "events_max_concurrency": _ORACLE_EVENTS_MAX_CONCURRENCY,
    "events_attribution": _ORACLE_EVENTS_ATTRIBUTION,
    "events_session_funnel": _ORACLE_EVENTS_SESSION_FUNNEL,
    "events_forecast_baseline": _ORACLE_EVENTS_FORECAST_BASELINE,
    "events_wau_rolling": _ORACLE_EVENTS_WAU_ROLLING,
    "events_dau_mau": _ORACLE_EVENTS_DAU_MAU,
    "events_activity_concentration": _ORACLE_EVENTS_ACTIVITY_CONCENTRATION,
    "events_return_rate": _ORACLE_EVENTS_RETURN_RATE,
    "events_cohort_ltv": _ORACLE_EVENTS_COHORT_LTV,
    "events_attribution_linear": _ORACLE_EVENTS_ATTRIBUTION_LINEAR,
    "events_ewma": _ORACLE_EVENTS_EWMA,
    "events_croston_forecast": _ORACLE_CROSTON,
    "survival_rmst": _ORACLE_RMST,
    "events_periodogram_lut": _sql_periodogram(),
    "events_theta_forecast": _ORACLE_THETA_FORECAST,
    "events_twap": _ORACLE_EVENTS_TWAP,
    "events_cusum_changepoint": _ORACLE_CUSUM,
    "events_seasonal_hourly": _ORACLE_SEASONAL,
    "events_mad_outliers": _ORACLE_MAD_OUTLIERS,
    "events_holt_linear": _ORACLE_HOLT,
    "events_lttb_downsample": _sql_lttb(),
    "events_funnel_exclusion": _ORACLE_FUNNEL_EXCLUSION,
    "events_seasonal_strength": _ORACLE_SEASONAL_STRENGTH,
    "events_burstiness": _ORACLE_BURSTINESS,
    "events_cross_correlation": _ORACLE_XCORR,
    "survival_kaplan_meier": _ORACLE_KM,
    "events_peak_detection": _ORACLE_PEAKS,
    "events_time_to_convert": _ORACLE_TIME_TO_CONVERT,
    "events_interpolate_linear": _ORACLE_INTERP,
    "events_holt_winters": _ORACLE_HW,
    "events_engagement_l28": _sql_engagement_l28(),
    "events_holiday_lift": _sql_holiday_lift(),
    "events_markov_stationary": _sql_markov(),
    "events_dow_hour_heatmap": _ORACLE_DOW_HEATMAP,
    "events_seasonal_anomaly": _ORACLE_SEASONAL_ANOMALY,
    "events_traffic_envelope": _ORACLE_ENVELOPE,
    "events_attribution_ushaped": _ORACLE_ATTRIBUTION_USHAPED,
    "user_bot_screen": _ORACLE_BOT_SCREEN,
}
