"""Temporal join operators Spark lacks as primitives (north-star brief:
"custom operators ... as a composition of existing DataFrame ops").

AS-OF JOIN — for every left event, the single most recent right event at or
before it (per key). Spark has no ASOF JOIN; the naive rendering is a
non-equi range join (quadratic per key). The composition here is the
scale-correct one: union-tag both sides, one window sorted by (ts, side,
id) per key, and ``last(..., ignorenulls)`` carries the most recent right
row forward onto each left row. One shuffle on the key, linear work — at
100 TB this is the same shape as any keyed window aggregate. The DuckDB
oracle uses its native ``ASOF LEFT JOIN``, so the composition is checked
against a real asof implementation, not against itself.

RANGE (INTERVAL) JOIN — attach rows to the interval(s) containing their
value. With a small interval table the right plan is a broadcast
nested-loop join on the BETWEEN predicate: the fact side never shuffles
and never expands beyond its matches. (When bands are aligned and
non-overlapping this lowers further to a narrow CASE/width-bucket map with
no join at all; for big-big interval joins the published answer is an
IEJoin / sort-based interval algorithm — out of scope here, the dim is
deliberately small as in the reference's lookup-table patterns.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from us_flight_bigdata_dashboard_spark.functions.exact import dsum, sql_dsum
from us_flight_bigdata_dashboard_spark.sources.catalog import load_table


def q_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """For every click event: the most recent 'view' event of the same user
    at or before it (classic as-of: trade↔quote, event↔state lookup).

    Views are first deduped to one row per (user, ts) — keep the max
    event_id and its value (``max_by``; event_id is unique so the choice is
    deterministic) — because an as-of match on a tied timestamp must be
    unambiguous in both engines. Then one union + one per-user window:
    rows sort by (ts, side, id) with views before clicks on equal ts (<=
    semantics), and ``last(view_col, ignorenulls=true)`` propagates the
    latest view onto each click row. Clicks with no prior view keep NULLs
    (left-join semantics), matching DuckDB's ASOF LEFT JOIN oracle."""
    events = load_table(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    views = (
        events.filter(F.col("event_type") == "view")
        .groupBy("user_id", "ts")
        .agg(
            F.max("event_id").alias("view_event_id"),
            F.max_by("value", "event_id").alias("view_value"),
        )
    )
    clicks = events.filter(F.col("event_type") == "click").select(
        "user_id", "ts", F.col("event_id").alias("click_event_id"), F.col("value").alias("click_value")
    )
    v = views.select(
        "user_id",
        "ts",
        F.lit(0).alias("_side"),
        "view_event_id",
        F.col("ts").alias("view_ts"),
        "view_value",
        F.lit(None).cast("bigint").alias("click_event_id"),
        F.lit(None).cast("double").alias("click_value"),
    )
    c = clicks.select(
        "user_id",
        "ts",
        F.lit(1).alias("_side"),
        F.lit(None).cast("bigint").alias("view_event_id"),
        F.lit(None).cast("timestamp").alias("view_ts"),
        F.lit(None).cast("double").alias("view_value"),
        "click_event_id",
        "click_value",
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy(
            F.col("ts").asc(),
            F.col("_side").asc(),
            F.coalesce("view_event_id", "click_event_id").asc(),
        )
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    merged = v.unionByName(c).select(
        "user_id",
        "ts",
        "_side",
        "click_event_id",
        "click_value",
        F.last("view_event_id", ignorenulls=True).over(w).alias("asof_view_event_id"),
        F.last("view_ts", ignorenulls=True).over(w).alias("asof_view_ts"),
        F.last("view_value", ignorenulls=True).over(w).alias("asof_view_value"),
    )
    return merged.filter(F.col("_side") == 1).select(
        "click_event_id",
        "user_id",
        F.col("ts").alias("click_ts"),
        "click_value",
        "asof_view_event_id",
        "asof_view_ts",
        "asof_view_value",
    )


_ORACLE_ASOF_JOIN = """
WITH ev AS (
  SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id, event_type, value
  FROM events WHERE ts IS NOT NULL
),
views_d AS (
  SELECT user_id, ts,
         MAX(event_id) AS asof_view_event_id,
         arg_max(value, event_id) AS asof_view_value
  FROM ev WHERE event_type = 'view'
  GROUP BY 1, 2
),
clicks AS (
  SELECT event_id AS click_event_id, user_id, ts AS click_ts, value AS click_value
  FROM ev WHERE event_type = 'click'
)
SELECT c.click_event_id, c.user_id, c.click_ts, c.click_value,
       v.asof_view_event_id, v.ts AS asof_view_ts, v.asof_view_value
FROM clicks c ASOF LEFT JOIN views_d v
  ON c.user_id = v.user_id AND v.ts <= c.click_ts
"""


def q_asof_join_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward as-of: for every click, the EARLIEST view at-or-after it —
    the lookahead twin of the backward as-of (label-attribution shape:
    "what did the user see next"). Same one-union-one-window composition,
    with the window REVERSED: ``first(view_col, ignorenulls)`` over
    [current row, unbounded following), clicks sorted BEFORE views on
    equal timestamps so an equal-ts view is matched (>= semantics).
    View dedup per (user, ts) keeps the MIN event_id — the forward
    tie-break mirror of the backward operator's max."""
    events = load_table(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    views = (
        events.filter(F.col("event_type") == "view")
        .groupBy("user_id", "ts")
        .agg(
            F.min("event_id").alias("view_event_id"),
            F.min_by("value", "event_id").alias("view_value"),
        )
    )
    clicks = events.filter(F.col("event_type") == "click").select(
        "user_id",
        "ts",
        F.col("event_id").alias("click_event_id"),
        F.col("value").alias("click_value"),
    )
    v = views.select(
        "user_id",
        "ts",
        F.lit(1).alias("_side"),
        "view_event_id",
        F.col("ts").alias("view_ts"),
        "view_value",
        F.lit(None).cast("bigint").alias("click_event_id"),
        F.lit(None).cast("double").alias("click_value"),
    )
    c = clicks.select(
        "user_id",
        "ts",
        F.lit(0).alias("_side"),
        F.lit(None).cast("bigint").alias("view_event_id"),
        F.lit(None).cast(v.schema["view_ts"].dataType).alias("view_ts"),
        F.lit(None).cast("double").alias("view_value"),
        "click_event_id",
        "click_value",
    )
    # Forward look-up as a RUNNING frame over the REVERSED sort: the rows
    # at-or-after the current click in forward order are exactly the frame
    # (unboundedPreceding, currentRow) under (ts, _side, id) DESC, and
    # last(ignorenulls) picks the nearest of them. A literal
    # (currentRow, unboundedFollowing) frame with first(ignorenulls) makes
    # Spark rescan the frame PER ROW — O(k²) in the partition size, a hot-
    # user hazard at scale (measured wedged in the ×16 interpolation probe).
    w = (
        Window.partitionBy("user_id")
        .orderBy(
            F.col("ts").desc(),
            F.col("_side").desc(),
            F.coalesce("view_event_id", "click_event_id").desc(),
        )
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    merged = v.unionByName(c).select(
        "user_id",
        "ts",
        "_side",
        "click_event_id",
        "click_value",
        F.last("view_event_id", ignorenulls=True).over(w).alias("next_view_event_id"),
        F.last("view_ts", ignorenulls=True).over(w).alias("next_view_ts"),
        F.last("view_value", ignorenulls=True).over(w).alias("next_view_value"),
    )
    return merged.filter(F.col("_side") == 0).select(
        "click_event_id",
        "user_id",
        F.col("ts").alias("click_ts"),
        "click_value",
        "next_view_event_id",
        "next_view_ts",
        "next_view_value",
    )


_ORACLE_ASOF_JOIN_FORWARD = """
WITH ev AS (
  SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id, event_type, value
  FROM events WHERE ts IS NOT NULL
),
views_d AS (
  SELECT user_id, ts,
         MIN(event_id) AS next_view_event_id,
         arg_min(value, event_id) AS next_view_value
  FROM ev WHERE event_type = 'view'
  GROUP BY 1, 2
),
clicks AS (
  SELECT event_id AS click_event_id, user_id, ts AS click_ts, value AS click_value
  FROM ev WHERE event_type = 'click'
)
SELECT c.click_event_id, c.user_id, c.click_ts, c.click_value,
       v.next_view_event_id, v.ts AS next_view_ts, v.next_view_value
FROM clicks c ASOF LEFT JOIN views_d v
  ON c.user_id = v.user_id AND v.ts >= c.click_ts
"""


def q_asof_join_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest as-of: for every click, the view CLOSEST in time in either
    direction (sensor-fusion / nearest-state alignment). Both directional
    candidates come from ONE union and one shuffle on user_id — two
    keyed RUNNING-frame passes (ascending for backward, descending for
    forward: the O(n) shape; a following-frame ``first`` would rescan
    per row, O(k²) in hot users). Tie policy is explicit — equal
    distance resolves BACKWARD (and an equal-timestamp view is distance
    0 via the backward branch). The gap is integer microseconds, so the
    comparison and output are exact."""
    events = load_table(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    views = (
        events.filter(F.col("event_type") == "view")
        .groupBy("user_id", "ts")
        .agg(
            F.max("event_id").alias("bwd_event_id"),
            F.min("event_id").alias("fwd_event_id"),
        )
    )
    clicks = events.filter(F.col("event_type") == "click").select(
        "user_id", "ts", F.col("event_id").alias("click_event_id")
    )
    v = views.select(
        "user_id",
        "ts",
        F.lit(0).alias("_side"),
        "bwd_event_id",
        "fwd_event_id",
        F.col("ts").alias("view_ts"),
        F.lit(None).cast("bigint").alias("click_event_id"),
    )
    c = clicks.select(
        "user_id",
        "ts",
        F.lit(1).alias("_side"),
        F.lit(None).cast("bigint").alias("bwd_event_id"),
        F.lit(None).cast("bigint").alias("fwd_event_id"),
        F.lit(None).cast(v.schema["view_ts"].dataType).alias("view_ts"),
        "click_event_id",
    )
    order = (
        F.col("ts").asc(),
        F.col("_side").asc(),
        F.coalesce("bwd_event_id", "click_event_id").asc(),
    )
    wb = (
        Window.partitionBy("user_id")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # forward branch as a running frame over the reversed sort (same
    # frame-set identity as q_asof_join_forward's rewrite — the naive
    # following-frame version rescans per row, O(k²) in hot users)
    wf = (
        Window.partitionBy("user_id")
        .orderBy(
            F.col("ts").desc(),
            F.col("_side").desc(),
            F.coalesce("bwd_event_id", "click_event_id").desc(),
        )
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    merged = v.unionByName(c).select(
        "user_id",
        "ts",
        "_side",
        "click_event_id",
        F.last("bwd_event_id", ignorenulls=True).over(wb).alias("b_id"),
        F.last("view_ts", ignorenulls=True).over(wb).alias("b_ts"),
        F.last("fwd_event_id", ignorenulls=True).over(wf).alias("f_id"),
        F.last("view_ts", ignorenulls=True).over(wf).alias("f_ts"),
    )
    b_gap = F.expr("timestampdiff(MICROSECOND, b_ts, ts)")
    f_gap = F.expr("timestampdiff(MICROSECOND, ts, f_ts)")
    pick_b = F.col("f_ts").isNull() | (
        F.col("b_ts").isNotNull() & (b_gap <= f_gap)
    )
    return (
        merged.filter(F.col("_side") == 1)
        .select(
            "click_event_id",
            "user_id",
            F.col("ts").alias("click_ts"),
            F.when(pick_b, F.col("b_id")).otherwise(F.col("f_id")).alias(
                "nearest_view_event_id"
            ),
            F.when(pick_b, F.col("b_ts")).otherwise(F.col("f_ts")).alias(
                "nearest_view_ts"
            ),
            F.when(pick_b, b_gap).otherwise(f_gap).alias("gap_us"),
            F.when(F.col("b_id").isNull() & F.col("f_id").isNull(), None)
            .when(pick_b, F.lit("backward"))
            .otherwise(F.lit("forward"))
            .alias("direction"),
        )
    )


_ORACLE_ASOF_JOIN_NEAREST = """
WITH ev AS (
  SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id, event_type, value
  FROM events WHERE ts IS NOT NULL
),
views_d AS (
  SELECT user_id, ts,
         MAX(event_id) AS bwd_event_id,
         MIN(event_id) AS fwd_event_id
  FROM ev WHERE event_type = 'view'
  GROUP BY 1, 2
),
clicks AS (
  SELECT event_id AS click_event_id, user_id, ts AS click_ts
  FROM ev WHERE event_type = 'click'
),
b AS (
  SELECT c.click_event_id, v.bwd_event_id AS b_id, v.ts AS b_ts
  FROM clicks c ASOF LEFT JOIN views_d v
    ON c.user_id = v.user_id AND v.ts <= c.click_ts
),
f AS (
  SELECT c.click_event_id, v.fwd_event_id AS f_id, v.ts AS f_ts
  FROM clicks c ASOF LEFT JOIN views_d v
    ON c.user_id = v.user_id AND v.ts >= c.click_ts
)
SELECT c.click_event_id, c.user_id, c.click_ts,
       CASE WHEN f.f_ts IS NULL OR (b.b_ts IS NOT NULL
                 AND date_diff('microseconds', b.b_ts, c.click_ts)
                     <= date_diff('microseconds', c.click_ts, f.f_ts))
            THEN b.b_id ELSE f.f_id END AS nearest_view_event_id,
       CASE WHEN f.f_ts IS NULL OR (b.b_ts IS NOT NULL
                 AND date_diff('microseconds', b.b_ts, c.click_ts)
                     <= date_diff('microseconds', c.click_ts, f.f_ts))
            THEN b.b_ts ELSE f.f_ts END AS nearest_view_ts,
       CASE WHEN f.f_ts IS NULL OR (b.b_ts IS NOT NULL
                 AND date_diff('microseconds', b.b_ts, c.click_ts)
                     <= date_diff('microseconds', c.click_ts, f.f_ts))
            THEN date_diff('microseconds', b.b_ts, c.click_ts)
            ELSE date_diff('microseconds', c.click_ts, f.f_ts) END AS gap_us,
       CASE WHEN b.b_id IS NULL AND f.f_id IS NULL THEN NULL
            WHEN f.f_ts IS NULL OR (b.b_ts IS NOT NULL
                 AND date_diff('microseconds', b.b_ts, c.click_ts)
                     <= date_diff('microseconds', c.click_ts, f.f_ts))
            THEN 'backward' ELSE 'forward' END AS direction
FROM clicks c
JOIN b USING (click_event_id)
JOIN f USING (click_event_id)
"""


PRICE_BANDS = [
    ("budget", 0.0, 60_000.0),
    ("mid", 60_000.0, 180_000.0),
    ("premium", 180_000.0, 1_000_000_000.0),
]


def q_range_join_price_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval join: orders attached to the price band containing their
    total (half-open [lo, hi)), then a per-band rollup. The band table is a
    3-row literal → broadcast nested-loop on the BETWEEN predicate; the
    orders side stays where it is (no shuffle until the final 3-group
    agg)."""
    orders = load_table(spark, sf_dir, "orders")
    bands = spark.createDataFrame(PRICE_BANDS, "band string, lo double, hi double")
    joined = orders.join(
        F.broadcast(bands),
        (F.col("o_totalprice") >= F.col("lo")) & (F.col("o_totalprice") < F.col("hi")),
    )
    return (
        joined.groupBy("band", "lo", "hi")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            dsum("o_totalprice").alias("sum_price"),
        )
    )


_ORACLE_RANGE_JOIN = f"""
SELECT band, lo, hi,
       COUNT(*) AS n_orders,
       {sql_dsum("o_totalprice")} AS sum_price
FROM orders
JOIN (VALUES ('budget', CAST(0 AS DOUBLE), CAST(60000 AS DOUBLE)),
             ('mid', CAST(60000 AS DOUBLE), CAST(180000 AS DOUBLE)),
             ('premium', CAST(180000 AS DOUBLE), CAST(1000000000 AS DOUBLE))) b(band, lo, hi)
  ON o_totalprice >= lo AND o_totalprice < hi
GROUP BY 1, 2, 3
"""


# ---------------------------------------------------------------------------
# Big-big interval overlap (bucket-banded band join — no broadcast side)
# ---------------------------------------------------------------------------

OVERLAP_WINDOW_DAYS = 30


def q_interval_overlap_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per order: how many lineitems (ANY order's) shipped inside its
    {OVERLAP_WINDOW_DAYS}-day window — a BIG-BIG interval join with no
    join key, the case the module docstring previously scoped out. Two
    scale levers make it linear:

    1. AGGREGATE-FIRST: the fact side collapses to per-day ship counts
       (calendar-bounded — thousands of rows at ANY fact scale), so the
       non-equi join moves day rows, not lineitems.
    2. BUCKET BANDING: both sides get a month-bucket key — each order
       explodes to the (2-3) month buckets its window touches (3 is real:
       a 30-day window starting Jan 31 ends Mar 1 because February is
       short — an explicit bucket SEQUENCE, not an endpoints pair, or
       those windows silently lose their middle month) and the join is an
       EQUI join on bucket with the range predicate as a residual filter.
       Join fan-out is ≤ windows×days-per-window, never |orders|×|days|;
       no side needs to broadcast.

    The DuckDB oracle is the UNbanded plain range join — an independent
    formulation, so the banding rewrite is verified, not assumed. Orders
    whose window contains no ship day report 0 (left semantics survive
    the explode because every order contributes its bucket rows)."""
    li = load_table(spark, sf_dir, "lineitem")
    days = li.groupBy(F.to_date("l_shipdate").alias("d")).agg(
        F.count(F.lit(1)).alias("c")
    )
    mb = lambda c: (F.year(c) * 12 + F.month(c)).cast("long")  # noqa: E731
    days_b = days.withColumn("bucket", mb(F.col("d")))
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", F.to_date("o_orderdate").alias("od")
    )
    orders_b = orders.select(
        "o_orderkey",
        "od",
        F.explode(
            F.sequence(
                mb(F.col("od")),
                mb(F.date_add(F.col("od"), OVERLAP_WINDOW_DAYS - 1)),
            )
        ).alias("bucket"),
    )
    joined = orders_b.join(
        days_b,
        (orders_b["bucket"] == days_b["bucket"])
        & (days_b["d"] >= orders_b["od"])
        & (days_b["d"] < F.date_add(orders_b["od"], OVERLAP_WINDOW_DAYS)),
        "left",
    )
    return (
        joined.groupBy("o_orderkey")
        .agg(F.coalesce(F.sum("c"), F.lit(0)).alias("n_shipped_in_window"))
        .orderBy("o_orderkey")
    )


_ORACLE_INTERVAL_OVERLAP_COUNTS = f"""
WITH days AS (
  SELECT CAST(l_shipdate AS DATE) AS d, COUNT(*) AS c FROM lineitem GROUP BY 1
)
SELECT o_orderkey, CAST(COALESCE(SUM(c), 0) AS BIGINT) AS n_shipped_in_window
FROM orders LEFT JOIN days
  ON d >= CAST(o_orderdate AS DATE)
 AND d < CAST(o_orderdate AS DATE) + {OVERLAP_WINDOW_DAYS}
GROUP BY o_orderkey
ORDER BY o_orderkey
"""



# ---------------------------------------------------------------------------
# Business-day (weekday-aware) lag arithmetic (round 8)
# ---------------------------------------------------------------------------


def _weekday_cum(x):
    """Weekdays among Monday-origin day indices [0, x): 5 per full week
    plus min(remainder, 5) — pure integer DIV/%/LEAST on both engines."""
    return F.lit(5) * F.expr(f"({x}) DIV 7") + F.least(
        F.expr(f"({x}) % 7"), F.lit(5)
    )


def q_business_days_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order→ship fulfillment lag in BUSINESS DAYS per order priority —
    calendar-day lags overstate weekend-spanning fulfillments by up to 2
    days, so every operations SLA counts weekdays. The count of weekdays
    in (order_date, ship_date] has an exact closed form: C(x) = 5·(x DIV
    7) + min(x mod 7, 5) counts weekdays among Monday-origin day indices
    [0, x); the Monday-origin shift is +3 (1970-01-01 was Thursday;
    epoch-day 4 was a Monday) and counting the HALF-OPEN (o, s] rather
    than [o, s) adds one more — hence weekdays(o, s] = C(s+4) − C(o+4).
    No calendar table, no per-day explode, no engine week functions (the
    fiscal_445 discipline) — three integer ops per row, verified against
    a day-by-day Python brute force in tests/test_round8_ops.py.

    Scale shape: one fact-to-fact equi-join on the order key (both sides
    pre-projected to two columns) and one 5-group map-side-combinable
    agg; the lag expression fuses into the scan."""
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority"
    )
    j = li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
    lag = _weekday_cum("datediff(l_shipdate, DATE'1970-01-01') + 4") - _weekday_cum(
        "datediff(o_orderdate, DATE'1970-01-01') + 4"
    )
    rows = j.select(F.col("o_orderpriority"), lag.alias("biz_lag"))
    return (
        rows.groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.sum(F.col("biz_lag").cast("decimal(38,0)"))
            .cast("double")
            .alias("sum_lag"),
            F.min("biz_lag").cast("long").alias("min_lag"),
            F.max("biz_lag").cast("long").alias("max_lag"),
        )
        .select(
            "o_orderpriority",
            "n_lines",
            (F.col("sum_lag") / F.col("n_lines").cast("double")).alias("avg_biz_days"),
            "min_lag",
            "max_lag",
        )
        .orderBy("o_orderpriority")
    )


def _sql_business_days() -> str:
    def cum(x):
        return f"(5 * (({x}) // 7) + LEAST(({x}) % 7, 5))"

    sd = "(CAST(l_shipdate AS DATE) - DATE '1970-01-01') + 4"
    od = "(CAST(o_orderdate AS DATE) - DATE '1970-01-01') + 4"
    return f"""
WITH rows_t AS (
  SELECT o_orderpriority,
         {cum(sd)} - {cum(od)} AS biz_lag
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
)
SELECT o_orderpriority,
       COUNT(*) AS n_lines,
       CAST(SUM(CAST(biz_lag AS DECIMAL(38,0))) AS DOUBLE)
         / CAST(COUNT(*) AS DOUBLE) AS avg_biz_days,
       CAST(MIN(biz_lag) AS BIGINT) AS min_lag,
       CAST(MAX(biz_lag) AS BIGINT) AS max_lag
FROM rows_t
GROUP BY 1
ORDER BY o_orderpriority
"""


# ---------------------------------------------------------------------------
# As-of join with a match TOLERANCE (round 10 wave 10)
# ---------------------------------------------------------------------------

ASOF_TOL_US = 6 * 3600 * 1_000_000  # 6-hour tolerance (market-data default shape)


def q_asof_join_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest as-of join WITH a tolerance bound — the third member of
    the as-of family (backward / nearest / nearest-within-tolerance) and
    the semantics market-data systems treat as first-class (pandas
    ``merge_asof(tolerance=...)``, kdb ``wj``): a state older than the
    bound is NOT an acceptable stand-in, so the click keeps a NULL match
    and a ``within_tolerance = 0`` flag instead of a stale pairing.
    Composes ``asof_join_nearest``'s one-union two-running-frame plan
    verbatim (same O(n) shape, no new shuffle) and applies the bound as
    a final projection — tolerance is a POST-FILTER on the nearest
    match by definition, not a different join.

    Exactness: the gap is integer microseconds; the bound is a literal;
    nullification is deterministic. Scale shape: identical to
    ``asof_join_nearest``."""
    near = q_asof_join_nearest(spark, sf_dir)
    ok = F.col("gap_us").isNotNull() & (F.col("gap_us") <= F.lit(ASOF_TOL_US))
    return near.select(
        "click_event_id",
        "user_id",
        "click_ts",
        F.when(ok, F.col("nearest_view_event_id")).alias("view_event_id"),
        F.when(ok, F.col("nearest_view_ts")).alias("view_ts"),
        F.when(ok, F.col("gap_us")).alias("gap_us"),
        ok.cast("int").alias("within_tolerance"),
    )


def _oracle_asof_tolerance() -> str:
    return f"""
WITH near AS ({_ORACLE_ASOF_JOIN_NEAREST})
SELECT click_event_id, user_id, click_ts,
       CASE WHEN gap_us IS NOT NULL AND gap_us <= {ASOF_TOL_US}
            THEN nearest_view_event_id END AS view_event_id,
       CASE WHEN gap_us IS NOT NULL AND gap_us <= {ASOF_TOL_US}
            THEN nearest_view_ts END AS view_ts,
       CASE WHEN gap_us IS NOT NULL AND gap_us <= {ASOF_TOL_US}
            THEN gap_us END AS gap_us,
       CAST(CASE WHEN gap_us IS NOT NULL AND gap_us <= {ASOF_TOL_US}
                 THEN 1 ELSE 0 END AS INT) AS within_tolerance
FROM near
"""


QUERIES = {
    "business_days_lag": q_business_days_lag,
    "asof_join": q_asof_join,
    "interval_overlap_counts": q_interval_overlap_counts,
    "asof_join_forward": q_asof_join_forward,
    "asof_join_nearest": q_asof_join_nearest,
    "asof_join_tolerance": q_asof_join_tolerance,
    "range_join_price_bands": q_range_join_price_bands,
}

ORACLE = {
    "business_days_lag": _sql_business_days(),
    "asof_join": _ORACLE_ASOF_JOIN,
    "interval_overlap_counts": _ORACLE_INTERVAL_OVERLAP_COUNTS,
    "asof_join_forward": _ORACLE_ASOF_JOIN_FORWARD,
    "asof_join_nearest": _ORACLE_ASOF_JOIN_NEAREST,
    "asof_join_tolerance": _oracle_asof_tolerance(),
    "range_join_price_bands": _ORACLE_RANGE_JOIN,
}
