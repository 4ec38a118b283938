"""Additional operator breadth: pivot (inverse of the A8 unpivot),
INTERSECT/EXCEPT set ops, and the date-function scalar surface — rounding
out "a user could run every query they run today, and the obvious next
ones" (SURVEY.md §7 completeness)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from us_flight_bigdata_dashboard_spark.functions.exact import dsum, sql_dsum
from us_flight_bigdata_dashboard_spark.sources.catalog import load_table


def q_pivot_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot linestatus values into columns (explicit value list — at scale
    an implicit pivot triggers a distinct-scan job first)."""
    lineitem = load_table(spark, sf_dir, "lineitem")
    pivoted = (
        lineitem.groupBy("l_returnflag")
        .pivot("l_linestatus", ["F", "O"])
        .agg(F.count(F.lit(1)).alias("n"), dsum("l_quantity").alias("qty"))
    )
    return pivoted.select(
        "l_returnflag",
        F.coalesce(F.col("F_n"), F.lit(0)).alias("f_count"),
        F.coalesce(F.col("F_qty"), F.lit(0.0)).alias("f_qty"),
        F.coalesce(F.col("O_n"), F.lit(0)).alias("o_count"),
        F.coalesce(F.col("O_qty"), F.lit(0.0)).alias("o_qty"),
    )


_ORACLE_PIVOT_STATUS = f"""
SELECT l_returnflag,
       CAST(COALESCE(SUM(CASE WHEN l_linestatus = 'F' THEN 1 ELSE 0 END), 0) AS BIGINT) AS f_count,
       COALESCE({sql_dsum("CASE WHEN l_linestatus = 'F' THEN l_quantity END")}, 0.0) AS f_qty,
       CAST(COALESCE(SUM(CASE WHEN l_linestatus = 'O' THEN 1 ELSE 0 END), 0) AS BIGINT) AS o_count,
       COALESCE({sql_dsum("CASE WHEN l_linestatus = 'O' THEN l_quantity END")}, 0.0) AS o_qty
FROM lineitem
GROUP BY 1
"""


def q_intersect_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT and EXCEPT (distinct set semantics), tagged and stacked:
    nations having both customers and suppliers vs customer-only nations."""
    customer = load_table(spark, sf_dir, "customer")
    supplier = load_table(spark, sf_dir, "supplier")
    c = customer.select(F.col("c_nationkey").alias("nationkey"))
    s = supplier.select(F.col("s_nationkey").alias("nationkey"))
    both = c.intersect(s).select(F.lit("both").alias("set_op"), "nationkey")
    # subtract = distinct EXCEPT (exceptAll would be multiset semantics:
    # it removes one supplier occurrence per nation and keeps the rest)
    only_c = c.subtract(s).select(F.lit("customer_only").alias("set_op"), "nationkey")
    return both.unionByName(only_c)


_ORACLE_INTERSECT_EXCEPT = """
SELECT 'both' AS set_op, nationkey FROM (
  SELECT c_nationkey AS nationkey FROM customer
  INTERSECT
  SELECT s_nationkey FROM supplier
)
UNION ALL
SELECT 'customer_only', nationkey FROM (
  SELECT c_nationkey AS nationkey FROM customer
  EXCEPT
  SELECT s_nationkey FROM supplier
)
"""


def q_date_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date scalar surface: extract fields, BTS-convention day-of-week,
    month-end, offset arithmetic, day difference vs an epoch anchor."""
    orders = load_table(spark, sf_dir, "orders")
    d = F.col("o_orderdate").cast("date")
    return orders.filter(F.col("o_orderkey") % 97 == 0).select(
        "o_orderkey",
        d.alias("order_date"),
        F.year(d).alias("order_year"),
        F.quarter(d).alias("order_quarter"),
        F.month(d).alias("order_month"),
        F.dayofmonth(d).alias("order_day"),
        (((F.dayofweek(d) + F.lit(5)) % F.lit(7)) + F.lit(1)).alias("iso_dow"),
        F.last_day(d).alias("month_end"),
        F.date_add(d, 30).alias("due_date"),
        F.datediff(d, F.lit("1992-01-01").cast("date")).alias("days_since_epoch"),
    )


_ORACLE_DATE_FUNCTIONS = """
SELECT o_orderkey,
       CAST(o_orderdate AS DATE) AS order_date,
       CAST(year(o_orderdate) AS INTEGER) AS order_year,
       CAST(quarter(o_orderdate) AS INTEGER) AS order_quarter,
       CAST(month(o_orderdate) AS INTEGER) AS order_month,
       CAST(day(o_orderdate) AS INTEGER) AS order_day,
       CAST(isodow(o_orderdate) AS INTEGER) AS iso_dow,
       last_day(CAST(o_orderdate AS DATE)) AS month_end,
       CAST(CAST(o_orderdate AS DATE) + INTERVAL 30 DAY AS DATE) AS due_date,
       CAST(date_diff('day', DATE '1992-01-01', CAST(o_orderdate AS DATE)) AS INTEGER) AS days_since_epoch
FROM orders
WHERE o_orderkey % 97 = 0
"""


def q_window_lead_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lead/lag order-sequence analysis: per customer, the previous and
    next order dates and the inter-order gap in days. One shuffle on the
    partition key, sort within — the canonical keyed-window shape (same
    cost class at 100 TB as any per-entity sessionization). Order is made
    total with the orderkey tiebreak so lag/lead are deterministic on
    same-day orders."""
    orders = load_table(spark, sf_dir, "orders")
    d = F.col("o_orderdate").cast("date")
    w = Window.partitionBy("o_custkey").orderBy(d.asc(), F.col("o_orderkey").asc())
    return orders.select(
        "o_custkey",
        "o_orderkey",
        d.alias("order_date"),
        F.lag(d).over(w).alias("prev_order_date"),
        F.lead(d).over(w).alias("next_order_date"),
        F.datediff(d, F.lag(d).over(w)).alias("days_since_prev"),
    )


_ORACLE_WINDOW_LEAD_LAG = """
SELECT o_custkey, o_orderkey,
       CAST(o_orderdate AS DATE) AS order_date,
       lag(CAST(o_orderdate AS DATE)) OVER w AS prev_order_date,
       lead(CAST(o_orderdate AS DATE)) OVER w AS next_order_date,
       CAST(date_diff('day',
                      lag(CAST(o_orderdate AS DATE)) OVER w,
                      CAST(o_orderdate AS DATE)) AS INTEGER) AS days_since_prev
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY CAST(o_orderdate AS DATE) ASC, o_orderkey ASC)
"""


def q_window_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative revenue per customer over their order history (running
    total, unbounded-preceding frame). Addends are decimal-quantized (the
    ``dsum`` construction) so every prefix sum is exact and engine- and
    partition-independent — a running double sum would drift in the last
    ulps and fail the hash gate."""
    orders = load_table(spark, sf_dir, "orders")
    d = F.col("o_orderdate").cast("date")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(d.asc(), F.col("o_orderkey").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return orders.select(
        "o_custkey",
        "o_orderkey",
        d.alias("order_date"),
        F.sum(F.col("o_totalprice").cast("decimal(28,4)")).over(w).cast("double").alias(
            "running_revenue"
        ),
    )


_ORACLE_WINDOW_RUNNING_SUM = """
SELECT o_custkey, o_orderkey,
       CAST(o_orderdate AS DATE) AS order_date,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(28,4))) OVER (
         PARTITION BY o_custkey
         ORDER BY CAST(o_orderdate AS DATE) ASC, o_orderkey ASC
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
       ) AS DOUBLE) AS running_revenue
FROM orders
"""


def q_null_safe_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equality join (`<=>` / IS NOT DISTINCT FROM): NULL keys
    match each other instead of vanishing — the semantics SQL users need
    when a dimension key is legitimately absent on both sides.

    Keys are made nullable deterministically (priority → NULL for keys
    ≡0 mod 5) and both sides pre-aggregate to priority cardinality before
    the join, so the null-safe comparison runs over dimension-sized inputs
    (broadcast at any scale); the NULL⋈NULL row survives with both counts."""
    orders = load_table(spark, sf_dir, "orders")
    keyed = orders.select(
        F.when(F.col("o_orderkey") % 5 == 0, F.lit(None))
        .otherwise(F.col("o_orderpriority"))
        .alias("prio"),
        "o_orderkey",
        "o_totalprice",
    )
    left = keyed.groupBy("prio").agg(F.count(F.lit(1)).alias("n_all"))
    right = (
        keyed.filter(F.col("o_totalprice") > 150_000)
        .groupBy("prio")
        .agg(F.count(F.lit(1)).alias("n_big"))
    )
    return left.join(right, left["prio"].eqNullSafe(right["prio"]), "left").select(
        left["prio"].alias("prio"),
        "n_all",
        F.coalesce(F.col("n_big"), F.lit(0)).alias("n_big"),
    )


_ORACLE_NULL_SAFE_JOIN = """
WITH keyed AS (
  SELECT CASE WHEN o_orderkey % 5 = 0 THEN NULL ELSE o_orderpriority END AS prio,
         o_orderkey, o_totalprice
  FROM orders
), l AS (
  SELECT prio, COUNT(*) AS n_all FROM keyed GROUP BY 1
), r AS (
  SELECT prio, COUNT(*) AS n_big FROM keyed WHERE o_totalprice > 150000 GROUP BY 1
)
SELECT l.prio, l.n_all, COALESCE(r.n_big, 0) AS n_big
FROM l LEFT JOIN r ON l.prio IS NOT DISTINCT FROM r.prio
"""


def q_window_rolling_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact rolling median (7-row trailing frame) of daily revenue — the
    robust-smoothing window the dashboard's trend lines want (mean-based
    rolling averages exist in events_sliding_avg; the median variant needs
    an exact percentile as a *windowed* aggregate).

    Daily revenue is first reduced by a hash agg (map-side combined,
    decimal-exact sum), so the window runs over ~one row per day — tiny
    state no matter the fact-table size; ordering is a single total-order
    sort of day-cardinality rows. Median interpolation is the same
    ``rank = p·(n−1)`` linear rule in Spark ``percentile`` and DuckDB
    ``quantile_cont``, on identical doubles → bit-stable."""
    orders = load_table(spark, sf_dir, "orders")
    daily = (
        orders.groupBy(F.to_date("o_orderdate").alias("d"))
        .agg(dsum("o_totalprice").alias("daily_rev"))
    )
    w = Window.orderBy(F.col("d").asc()).rowsBetween(-6, Window.currentRow)
    return daily.select(
        "d",
        "daily_rev",
        F.expr("percentile(daily_rev, 0.5)").over(w).alias("rolling_median_7d"),
    )


_ORACLE_WINDOW_ROLLING_MEDIAN = f"""
WITH daily AS (
  SELECT CAST(o_orderdate AS DATE) AS d, {sql_dsum("o_totalprice")} AS daily_rev
  FROM orders GROUP BY 1
)
SELECT d, daily_rev,
       quantile_cont(daily_rev, 0.5) OVER (ORDER BY d ASC
         ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS rolling_median_7d
FROM daily
"""


def q_window_ntile_ranks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution-rank window surface: NTILE quartiles, PERCENT_RANK and
    CUME_DIST per order within its priority class (the remaining ANSI
    window-function family after rank/lead/lag/running aggregates). The
    order-by carries the key as a tiebreaker so every rank is total-order
    deterministic; percent_rank's ``(rank−1)/(n−1)`` is one double
    division on integers — bit-stable.

    Scale note: distribution ranks need each group's total order, and the
    unfiltered window gives one task per (low-cardinality) priority. The
    100 TB form derives the GLOBAL rank as bucket-offset + local rank over
    (priority, hash-range bucket) — the distributed prefix-sum shape
    ``sampling.q_token_budget_fill`` uses — then ntile/percent_rank/cume
    are closed-form in (global rank, n) — implemented and gate-proven as
    ``q_global_rank_bucketed``."""
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.col("o_totalprice").asc(), F.col("o_orderkey").asc()
    )
    return orders.select(
        "o_orderkey",
        "o_orderpriority",
        "o_totalprice",
        F.ntile(4).over(w).alias("quartile"),
        F.percent_rank().over(w).alias("pct_rank"),
        F.cume_dist().over(w).alias("cume"),
    )


_ORACLE_WINDOW_NTILE_RANKS = """
SELECT o_orderkey, o_orderpriority, o_totalprice,
       NTILE(4) OVER w AS quartile,
       PERCENT_RANK() OVER w AS pct_rank,
       CUME_DIST() OVER w AS cume
FROM orders
WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice ASC, o_orderkey ASC)
"""



def q_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-evolution union: combine an old-schema snapshot (no
    o_orderpriority column — simulating a table version written before the
    column existed) with a new-schema snapshot via ``unionByName(
    allowMissingColumns=True)``, the engine capability behind reading a
    parquet lake whose files span schema versions (``mergeSchema`` scans
    resolve by name the same way). Missing columns surface as NULL, and
    the aggregate proves exactly the old rows carry them.

    Scale shape: by-name resolution is plan-time only — the union is a
    zero-cost concatenation of scans, and the agg is one hash-agg over the
    2-value version tag. No shuffle beyond the 2-row final agg.
    """
    orders = load_table(spark, sf_dir, "orders")
    v1 = orders.filter(F.col("o_orderkey") % 3 == 0).select(
        "o_orderkey", "o_custkey", "o_totalprice", F.lit("v1").alias("schema_version")
    )
    v2 = orders.filter(F.col("o_orderkey") % 3 != 0).select(
        "o_orderkey", "o_custkey", "o_totalprice", "o_orderpriority",
        F.lit("v2").alias("schema_version"),
    )
    merged = v1.unionByName(v2, allowMissingColumns=True)
    return merged.groupBy("schema_version").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.when(F.col("o_orderpriority").isNull(), 1).otherwise(0)).alias(
            "n_null_priority"
        ),
        F.countDistinct("o_orderpriority").alias("n_priorities"),
    )


_ORACLE_SCHEMA_EVOLUTION = """
WITH merged AS (
  SELECT o_orderkey, o_custkey, o_totalprice, 'v1' AS schema_version
  FROM orders WHERE o_orderkey % 3 = 0
  UNION ALL BY NAME
  SELECT o_orderkey, o_custkey, o_totalprice, o_orderpriority, 'v2' AS schema_version
  FROM orders WHERE o_orderkey % 3 <> 0
)
SELECT schema_version,
       COUNT(*) AS n_rows,
       CAST(SUM(CASE WHEN o_orderpriority IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_null_priority,
       COUNT(DISTINCT o_orderpriority) AS n_priorities
FROM merged
GROUP BY 1
"""


# ---------------------------------------------------------------------------
# Time-RANGE window frames (interval-bounded rolling aggregates)
# ---------------------------------------------------------------------------

RANGE_DAYS = 7


def q_window_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling {RANGE_DAYS}-day revenue per customer: a RANGE window frame
    bounded by event TIME, not row count — the frame every "last N days"
    metric needs, and semantically different from a ROWS frame whenever
    timestamps repeat or gap (RANGE includes all ties and respects real
    gaps; ROWS blindly counts neighbors).

    Spark expresses interval RANGE frames over a numeric ordering column:
    integer day offsets (``datediff`` from a fixed epoch — ANSI mode
    forbids the timestamp→long cast shortcut) + ``rangeBetween(-(N-1),
    0)`` — identical semantics to the oracle's ``RANGE BETWEEN INTERVAL
    N-1 DAYS PRECEDING`` over the (midnight-aligned) timestamps. One
    shuffle on the partition key; the frame scan is a per-partition
    sorted sweep (no self-join — the naive equivalent is a range
    self-join that explodes at 100 TB).

    Output restricted to one returnflag-heavy month for bounded rows.
    """
    orders = load_table(spark, sf_dir, "orders")
    day = F.datediff(F.col("o_orderdate"), F.lit("1995-01-01").cast("timestamp"))
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(day)
        .rangeBetween(-(RANGE_DAYS - 1), 0)
    )
    return (
        orders.select(
            "o_custkey",
            "o_orderdate",
            "o_totalprice",
            F.sum(F.col("o_totalprice").cast("decimal(28,4)"))
            .over(w)
            .cast("double")
            .alias("rolling_revenue"),
            F.count(F.lit(1)).over(w).alias("n_orders_in_window"),
        )
        .filter(
            (F.col("o_orderdate") >= F.lit("1997-06-01").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1997-07-01").cast("timestamp"))
        )
        .orderBy("o_custkey", "o_orderdate")
    )


_ORACLE_WINDOW_RANGE_FRAME = f"""
SELECT o_custkey, o_orderdate, o_totalprice, rolling_revenue, n_orders_in_window
FROM (
  SELECT o_custkey, o_orderdate, o_totalprice,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(28,4))) OVER (
           PARTITION BY o_custkey ORDER BY o_orderdate
           RANGE BETWEEN INTERVAL {RANGE_DAYS - 1} DAYS PRECEDING AND CURRENT ROW
         ) AS DOUBLE) AS rolling_revenue,
         COUNT(*) OVER (
           PARTITION BY o_custkey ORDER BY o_orderdate
           RANGE BETWEEN INTERVAL {RANGE_DAYS - 1} DAYS PRECEDING AND CURRENT ROW
         ) AS n_orders_in_window
  FROM orders
)
WHERE o_orderdate >= TIMESTAMP '1997-06-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1997-07-01 00:00:00'
ORDER BY o_custkey, o_orderdate
"""


# ---------------------------------------------------------------------------
# Deterministic array aggregation
# ---------------------------------------------------------------------------


def q_array_agg_sorted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array-valued aggregation made deterministic: per return flag, the
    sorted distinct line statuses and sorted month list. ``collect_set``
    order is partition-dependent (NEVER hashable cross-engine or even
    run-to-run); wrapping in ``sort_array`` restores a total order, which
    is the only correct way to emit array columns from a distributed agg.
    The sorted arrays are emitted as comma-joined strings (lossless here —
    elements contain no commas) so result cells stay scalar for engines
    that sort/hash them, including the correctness driver.
    """
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.array_join(F.sort_array(F.collect_set("l_linestatus")), ",").alias(
                "statuses"
            ),
            F.array_join(
                F.transform(
                    F.sort_array(F.collect_set(F.month("l_shipdate").cast("int"))),
                    lambda m: m.cast("string"),
                ),
                ",",
            ).alias("ship_months"),
            F.count(F.lit(1)).alias("n_rows"),
        )
        .orderBy("l_returnflag")
    )


_ORACLE_ARRAY_AGG_SORTED = """
SELECT l_returnflag,
       array_to_string(list_sort(list(DISTINCT l_linestatus)), ',') AS statuses,
       array_to_string(list_sort(list(DISTINCT CAST(month(l_shipdate) AS INTEGER))), ',')
         AS ship_months,
       COUNT(*) AS n_rows
FROM lineitem
GROUP BY l_returnflag
ORDER BY l_returnflag
"""


def q_skyline_pareto(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-D skyline (Pareto frontier) over ``part``: keep parts not
    dominated on (maximize ``p_size``, minimize ``p_retailprice``) —
    q dominates p iff q.size ≥ p.size, q.price ≤ p.price, one strict.

    Scale shape — the naive skyline is an O(n²) all-pairs anti-join; this
    plan is one agg + one tiny window + one broadcast join, linear in n:
    (1) per-size min price (map-side-combined groupBy over ≤50 groups —
    ``p_size`` is low-cardinality by construction, TPC-H sizes are 1..50);
    (2) running min over *strictly larger* sizes via a rows-frame window
    on the ≤50-row per-size table (single-partition window is fine: 50
    rows, not the fact table); (3) broadcast that threshold table back.
    A part is on the frontier iff its price equals its size-group min
    (no same-size dominator, strict-price) and is strictly below every
    larger size's min (no larger-size dominator, price ≤). Only
    comparisons touch the double column, so pass-through values stay
    bit-identical. The DuckDB oracle is deliberately the *independent*
    NOT-EXISTS dominance formulation, so the window+join rewrite is
    checked against first-principles semantics, not itself."""
    parts = load_table(spark, sf_dir, "part").select(
        "p_partkey", "p_name", "p_size", "p_retailprice"
    )
    per_size = parts.groupBy("p_size").agg(
        F.min("p_retailprice").alias("min_price_eq")
    )
    w = Window.orderBy(F.col("p_size").desc()).rowsBetween(
        Window.unboundedPreceding, -1
    )
    thresh = per_size.withColumn("min_price_gt", F.min("min_price_eq").over(w))
    return (
        parts.join(F.broadcast(thresh), "p_size")
        .filter(
            (F.col("p_retailprice") == F.col("min_price_eq"))
            & (
                F.col("min_price_gt").isNull()
                | (F.col("p_retailprice") < F.col("min_price_gt"))
            )
        )
        .select("p_partkey", "p_name", "p_size", "p_retailprice")
    )


_ORACLE_SKYLINE_PARETO = """
SELECT p_partkey, p_name, p_size, p_retailprice
FROM part p
WHERE NOT EXISTS (
  SELECT 1 FROM part q
  WHERE q.p_size >= p.p_size
    AND q.p_retailprice <= p.p_retailprice
    AND (q.p_size > p.p_size OR q.p_retailprice < p.p_retailprice)
)
"""


# ---------------------------------------------------------------------------
# Bucketed global rank (scalable total-order ranking)
# ---------------------------------------------------------------------------

GR_BUCKETS = 256


def q_global_rank_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GLOBAL total-order rank of every order by (totalprice, orderkey) —
    computed WITHOUT the single-task global sort that ``ROW_NUMBER() OVER
    (ORDER BY ...)`` plans (an unpartitioned window funnels the whole
    table through one task; Spark even warns about it). This is the
    distributed form the full-partition window docstrings point at:

    1. one global min/max aggregate (2 scalars, broadcast back);
    2. value-range bucketing — monotone in the sort key, so bucket order
       IS sort order and equal keys can never straddle a bucket;
    3. per-bucket counts → cross-bucket rank offsets (a {GR_BUCKETS}-row
       cumsum, broadcast);
    4. per-row rank inside each bucket ({GR_BUCKETS}-way parallel window)
       plus the bucket offset = the exact global rank;
    5. percent_rank closed-form from (global rank, n).

    The oracle is the PLAIN unpartitioned ROW_NUMBER — the gate proves the
    bucketed decomposition is value-identical to the single-sort
    semantics. Same distributed-prefix-sum shape as
    ``sampling.q_token_budget_fill``; together they are the repo's
    pattern for order-statistics at 100 TB."""
    orders = load_table(spark, sf_dir, "orders")
    stats = orders.agg(
        F.min("o_totalprice").alias("_mn"),
        F.max("o_totalprice").alias("_mx"),
        F.count(F.lit(1)).alias("_n"),
    )
    base = orders.select("o_orderkey", "o_totalprice").crossJoin(F.broadcast(stats))
    bucket = F.coalesce(
        F.least(
            F.lit(GR_BUCKETS - 1),
            F.floor(
                (F.col("o_totalprice") - F.col("_mn"))
                * GR_BUCKETS
                / F.nullif(F.col("_mx") - F.col("_mn"), F.lit(0.0))
            ),
        ).cast("int"),
        F.lit(0),
    )
    bucketed = base.withColumn("_b", bucket)
    offsets = (
        bucketed.groupBy("_b")
        .agg(F.count(F.lit(1)).alias("_bn"))
        .withColumn(
            "_offset",
            F.coalesce(
                F.sum("_bn").over(
                    Window.orderBy("_b").rowsBetween(Window.unboundedPreceding, -1)
                ),
                F.lit(0),
            ),
        )
        .select("_b", "_offset")
    )
    w = Window.partitionBy("_b").orderBy(
        F.asc("o_totalprice"), F.asc("o_orderkey")
    )
    return (
        bucketed.join(F.broadcast(offsets), "_b")
        .withColumn("global_rank", F.col("_offset") + F.row_number().over(w))
        .select(
            "o_orderkey",
            "o_totalprice",
            "global_rank",
            (
                (F.col("global_rank") - F.lit(1)).cast("double")
                / F.nullif(F.col("_n") - F.lit(1), F.lit(0)).cast("double")
            ).alias("pct_rank"),
        )
    )


_ORACLE_GLOBAL_RANK_BUCKETED = """
SELECT o_orderkey, o_totalprice,
       ROW_NUMBER() OVER (ORDER BY o_totalprice, o_orderkey) AS global_rank,
       CAST(ROW_NUMBER() OVER (ORDER BY o_totalprice, o_orderkey) - 1 AS DOUBLE)
         / nullif(COUNT(*) OVER () - 1, 0) AS pct_rank
FROM orders
"""


EXACT_QUANTILES = [0.25, 0.5, 0.9, 0.99]


def q_exact_quantiles_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT global quantiles of order totalprice at scale — the
    complement to the ``approx_percentile`` sketch when the answer must be
    a real data value with zero error (SLA thresholds, billing tiers,
    regulatory percentiles). Built on the bucketed global rank: the
    quantile q is BY DEFINITION the value at rank ``ceil(q·n)``
    (lower-interpolation / discrete quantile), so after the
    {GR_BUCKETS}-way-parallel rank decomposition the answer is a filter on
    {len(EXACT_QUANTILES)} target ranks — no single-task sort, no second
    pass, error-free where the t-digest/GK sketch is approximate.

    Oracle: DuckDB's ``quantile_disc`` (identical lower-interpolation
    definition), cross-checked structurally by construction."""
    ranked = q_global_rank_bucketed(spark, sf_dir)
    n_row = load_table(spark, sf_dir, "orders").agg(F.count(F.lit(1)).alias("_n"))
    targets = n_row.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(q).alias("quantile"),
                        F.ceil(F.lit(q) * F.col("_n")).cast("long").alias("target_rank"),
                    )
                    for q in EXACT_QUANTILES
                ]
            )
        ).alias("t")
    ).select("t.quantile", "t.target_rank")
    return (
        ranked.join(
            F.broadcast(targets), ranked["global_rank"] == targets["target_rank"]
        )
        .select("quantile", F.col("o_totalprice").alias("value"))
        .orderBy("quantile")
    )


def _sql_exact_quantiles() -> str:
    rows = "\n  UNION ALL\n".join(
        f"  SELECT CAST({q} AS DOUBLE) AS quantile, quantile_disc(o_totalprice, {q}) AS value FROM orders"
        for q in EXACT_QUANTILES
    )
    return f"""
SELECT quantile, value FROM (
{rows}
)
ORDER BY quantile
"""


# ---------------------------------------------------------------------------
# Exact per-group MODE (most frequent value, deterministic tie-break)
# ---------------------------------------------------------------------------

def q_group_mode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact mode of l_quantity per (l_returnflag, l_linestatus) — the
    classic "most frequent value" aggregate Spark lacks as a builtin for
    deterministic results (its ``mode`` breaks ties arbitrarily).

    Two-phase: count per (group, value) — one additive hash aggregation,
    map-side combined — then a window ROW_NUMBER over each group ordered
    by (count DESC, value ASC): the explicit tie-break makes the answer
    a pure function of the data. The window partitions on the GROUP key
    after an aggregation that already shuffled on (group, value), so the
    second exchange moves only the distinct-value counts (bounded by the
    value domain, not the row count) — the same "aggregate first, rank
    the summary" shape as the heavy-hitters operator."""
    li = load_table(spark, sf_dir, "lineitem")
    counts = li.groupBy("l_returnflag", "l_linestatus", "l_quantity").agg(
        F.count(F.lit(1)).alias("n")
    )
    w = Window.partitionBy("l_returnflag", "l_linestatus").orderBy(
        F.desc("n"), F.asc("l_quantity")
    )
    return (
        counts.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select(
            "l_returnflag",
            "l_linestatus",
            F.col("l_quantity").alias("mode_quantity"),
            F.col("n").alias("mode_count"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


_ORACLE_GROUP_MODE = """
WITH counts AS (
  SELECT l_returnflag, l_linestatus, l_quantity, COUNT(*) AS n
  FROM lineitem GROUP BY 1, 2, 3
)
SELECT l_returnflag, l_linestatus, l_quantity AS mode_quantity, n AS mode_count
FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY l_returnflag, l_linestatus
                               ORDER BY n DESC, l_quantity ASC) AS rk
  FROM counts
)
WHERE rk = 1
ORDER BY l_returnflag, l_linestatus
"""



# ---------------------------------------------------------------------------
# Per-group box-plot (five-number + IQR outliers) (round 8)
# ---------------------------------------------------------------------------


def q_boxplot_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-priority box-plot statistics of order value: min / p25 / p50 /
    p75 / max as EXACT rank picks over integer cents, plus the Tukey
    1.5·IQR outlier count — the five-number summary every distribution
    panel draws, per group in ONE pass. Quartile ranks use the house
    (k·n + k+? → ceil) DIV convention of ``reorder_interval``; the
    fence compare is cross-multiplied integers (2·x vs 5·p75 − 3·p25 ⇔
    x vs p75 + 1.5·IQR) so no float appears anywhere in the outlier
    predicate.

    Scale shape: one per-group sort window for ranks (group-keyed — no
    global sort), one conditional-aggregate rollup per group; outlier
    counting joins the 5-row quartile frame BACK as a broadcast, so the
    second pass is a scan + broadcast hash join, map-side combinable."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderpriority",
        "o_orderkey",
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    w = Window.partitionBy("o_orderpriority").orderBy("cents", "o_orderkey")
    ranked = orders.select(
        "o_orderpriority",
        "cents",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(Window.partitionBy("o_orderpriority")).alias("n"),
    )
    pick = lambda expr: F.max(F.when(F.col("rn") == F.expr(expr), F.col("cents")))  # noqa: E731
    quart = ranked.groupBy("o_orderpriority").agg(
        F.max("n").alias("n_orders"),
        F.min("cents").alias("min_cents"),
        pick("(n + 3) DIV 4").alias("p25_cents"),
        pick("(n + 1) DIV 2").alias("p50_cents"),
        pick("(3 * n + 3) DIV 4").alias("p75_cents"),
        F.max("cents").alias("max_cents"),
    )
    withq = orders.join(F.broadcast(quart.select(
        "o_orderpriority", "p25_cents", "p75_cents"
    )), "o_orderpriority")
    # x > p75 + 1.5(p75−p25) ⇔ 2x > 5·p75 − 3·p25 ; low fence symmetric
    hi = F.col("cents") * 2 > F.col("p75_cents") * 5 - F.col("p25_cents") * 3
    lo = F.col("cents") * 2 < F.col("p25_cents") * 5 - F.col("p75_cents") * 3
    outliers = withq.groupBy("o_orderpriority").agg(
        F.sum(F.when(hi | lo, 1).otherwise(0)).cast("long").alias("n_outliers")
    )
    return (
        quart.join(outliers, "o_orderpriority")
        .select(
            "o_orderpriority",
            "n_orders",
            "min_cents",
            "p25_cents",
            "p50_cents",
            "p75_cents",
            "max_cents",
            "n_outliers",
        )
        .orderBy("o_orderpriority")
    )


_ORACLE_BOXPLOT = """
WITH cents_t AS (
  SELECT o_orderpriority, o_orderkey,
         CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents
  FROM orders
), ranked AS (
  SELECT o_orderpriority, cents,
         ROW_NUMBER() OVER (PARTITION BY o_orderpriority
                            ORDER BY cents, o_orderkey) AS rn,
         CAST(COUNT(*) OVER (PARTITION BY o_orderpriority) AS BIGINT) AS n
  FROM cents_t
), quart AS (
  SELECT o_orderpriority,
         MAX(n) AS n_orders,
         MIN(cents) AS min_cents,
         MAX(CASE WHEN rn = (n + 3) // 4 THEN cents END) AS p25_cents,
         MAX(CASE WHEN rn = (n + 1) // 2 THEN cents END) AS p50_cents,
         MAX(CASE WHEN rn = (3 * n + 3) // 4 THEN cents END) AS p75_cents,
         MAX(cents) AS max_cents
  FROM ranked GROUP BY 1
), outl AS (
  SELECT c.o_orderpriority,
         CAST(SUM(CASE WHEN c.cents * 2 > q.p75_cents * 5 - q.p25_cents * 3
                         OR c.cents * 2 < q.p25_cents * 5 - q.p75_cents * 3
                       THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
  FROM cents_t c JOIN quart q USING (o_orderpriority)
  GROUP BY 1
)
SELECT q.o_orderpriority, q.n_orders, q.min_cents, q.p25_cents, q.p50_cents,
       q.p75_cents, q.max_cents, o.n_outliers
FROM quart q JOIN outl o USING (o_orderpriority)
ORDER BY q.o_orderpriority
"""



# ---------------------------------------------------------------------------
# Weighted order statistics (round 8)
# ---------------------------------------------------------------------------


def q_weighted_median_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """QUANTITY-WEIGHTED median unit price per return flag: the value at
    which half the purchased VOLUME is cheaper — the number pricing
    actually cares about, and materially different from the row-median
    when large orders cluster at one end. Weighted order statistics via
    the classic cumulative-weight rank pick: sort by value within the
    group, running sum of integer weights, pick the first value whose
    cumulative weight reaches half the total (cross-multiplied integer
    compare 2·cum ≥ W — no float in the pick).

    Exactness: weights are integer quantities; unit price is exact cents
    (extendedprice is quantity·unit-price by construction, so the
    division is exact at 2 dp and rendered as cents DIV). Scale shape:
    one group-keyed sort window + one conditional-min rollup — the same
    single-shuffle shape as every per-group rank pick; the row-median
    twin is ``boxplot_stats``."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag",
        "l_orderkey",
        "l_linenumber",
        F.col("l_quantity").cast("long").alias("w"),
        F.expr(
            "CAST(ROUND(l_extendedprice * 100) AS BIGINT) DIV CAST(l_quantity AS BIGINT)"
        ).alias("unit_cents"),
    )
    wspec = Window.partitionBy("l_returnflag").orderBy(
        "unit_cents", "l_orderkey", "l_linenumber"
    )
    tot = Window.partitionBy("l_returnflag")
    cum = li.select(
        "l_returnflag",
        "unit_cents",
        F.sum("w").over(wspec).alias("cum_w"),
        F.sum("w").over(tot).alias("total_w"),
    )
    return (
        cum.filter(F.col("cum_w") * 2 >= F.col("total_w"))
        .groupBy("l_returnflag")
        .agg(
            F.max("total_w").alias("total_qty"),
            F.min("unit_cents").alias("weighted_median_cents"),
        )
        .orderBy("l_returnflag")
    )


_ORACLE_WEIGHTED_MEDIAN = """
WITH base AS (
  SELECT l_returnflag, l_orderkey, l_linenumber,
         CAST(l_quantity AS BIGINT) AS w,
         CAST(ROUND(l_extendedprice * 100) AS BIGINT)
           // CAST(l_quantity AS BIGINT) AS unit_cents
  FROM lineitem
), cum AS (
  SELECT l_returnflag, unit_cents,
         SUM(w) OVER (PARTITION BY l_returnflag
                      ORDER BY unit_cents, l_orderkey, l_linenumber
                      ROWS UNBOUNDED PRECEDING) AS cum_w,
         SUM(w) OVER (PARTITION BY l_returnflag) AS total_w
  FROM base
)
SELECT l_returnflag,
       CAST(MAX(total_w) AS BIGINT) AS total_qty,
       CAST(MIN(unit_cents) AS BIGINT) AS weighted_median_cents
FROM cum
WHERE cum_w * 2 >= total_w
GROUP BY 1
ORDER BY l_returnflag
"""


QUERIES = {
    "weighted_median_price": q_weighted_median_price,
    "boxplot_stats": q_boxplot_stats,
    "group_mode": q_group_mode,
    "pivot_status": q_pivot_status,
    "global_rank_bucketed": q_global_rank_bucketed,
    "exact_quantiles_bucketed": q_exact_quantiles_bucketed,
    "skyline_pareto": q_skyline_pareto,
    "window_range_frame": q_window_range_frame,
    "array_agg_sorted": q_array_agg_sorted,
    "null_safe_join": q_null_safe_join,
    "window_rolling_median": q_window_rolling_median,
    "window_ntile_ranks": q_window_ntile_ranks,
    "intersect_except": q_intersect_except,
    "date_functions": q_date_functions,
    "window_lead_lag": q_window_lead_lag,
    "window_running_sum": q_window_running_sum,
    "schema_evolution": q_schema_evolution,
}

ORACLE = {
    "weighted_median_price": _ORACLE_WEIGHTED_MEDIAN,
    "boxplot_stats": _ORACLE_BOXPLOT,
    "group_mode": _ORACLE_GROUP_MODE,
    "global_rank_bucketed": _ORACLE_GLOBAL_RANK_BUCKETED,
    "exact_quantiles_bucketed": _sql_exact_quantiles(),
    "pivot_status": _ORACLE_PIVOT_STATUS,
    "skyline_pareto": _ORACLE_SKYLINE_PARETO,
    "window_range_frame": _ORACLE_WINDOW_RANGE_FRAME,
    "array_agg_sorted": _ORACLE_ARRAY_AGG_SORTED,
    "null_safe_join": _ORACLE_NULL_SAFE_JOIN,
    "window_rolling_median": _ORACLE_WINDOW_ROLLING_MEDIAN,
    "window_ntile_ranks": _ORACLE_WINDOW_NTILE_RANKS,
    "intersect_except": _ORACLE_INTERSECT_EXCEPT,
    "date_functions": _ORACLE_DATE_FUNCTIONS,
    "window_lead_lag": _ORACLE_WINDOW_LEAD_LAG,
    "window_running_sum": _ORACLE_WINDOW_RUNNING_SUM,
    "schema_evolution": _ORACLE_SCHEMA_EVOLUTION,
}
