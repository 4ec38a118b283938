"""Decision-support completion pack: the remaining classic TPC-H query
shapes (Q2, Q4, Q6, Q8, Q9, Q11, Q12, Q13, Q14, Q15, Q16, Q18, Q19, Q20,
Q21, Q22), adapted to the testdata star schema.

The reference dashboard's query surface (SURVEY.md §2) was covered in
rounds 1-3; this module completes the standard decision-support shapes an
analytics engine is expected to run, so a user bringing arbitrary BI
workloads finds every canonical pattern implemented and exact-gated:

* correlated MIN subquery (Q2), EXISTS / NOT EXISTS semi and anti forms
  (Q4, Q21, Q22), IN over a GROUP BY ... HAVING subquery (Q18, Q20),
  NOT IN subquery (Q16), scalar-aggregate subqueries (Q11, Q15, Q22),
  disjunctive multi-attribute pushdown (Q19), conditional-ratio
  aggregates (Q8, Q12, Q14), outer-join distributions (Q13).

Schema adaptations (testdata has no partsupp/comment/commitdate columns):
the distinct (l_partkey, l_suppkey) projection of lineitem stands in for
partsupp; ship-delay versus order date stands in for commit/receipt
lateness; name suffix digits stand in for phone country codes; a
retail-price fraction stands in for ps_supplycost. Every adaptation keeps
the original query's PLAN shape (the thing being tested) intact.

Determinism: all double sums are decimal-quantized (functions/exact.dsum),
every LIMIT sits under a total order with key tiebreaks, and equality
filters against aggregated doubles (Q2's min, Q15's max) compare values
produced by the same exact arithmetic on both engines.

Scale notes are per-query; the recurring ones: dims broadcast, fact-side
filters sit on the scan (pushdown), semi/anti joins never materialize the
probe side, and group-by keys reuse join-shuffle partitioning where the
keys coincide.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from us_flight_bigdata_dashboard_spark.functions.exact import (
    dec_to_double,
    dsum,
    fsum,
    sql_dec_to_double,
    sql_dsum,
    sql_fsum,
)
from us_flight_bigdata_dashboard_spark.operators.statistics import (
    _CUM_BUCKETS,
    _cum_prev,
    _rank_prev_tied,
)
from us_flight_bigdata_dashboard_spark.sources.catalog import load_table


def _partsupp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ersatz partsupp: the distinct (part, supplier) pairs observed in
    lineitem. One shuffle on the pair key; at 100 TB this is the standard
    "derive the relationship table once, reuse it" pattern (materialize it
    bucketed by l_partkey if several queries consume it)."""
    return (
        load_table(spark, sf_dir, "lineitem")
        .select("l_partkey", "l_suppkey")
        .distinct()
    )


_SQL_PARTSUPP = "SELECT DISTINCT l_partkey, l_suppkey FROM lineitem"


# ---------------------------------------------------------------------------
# Q2 shape: minimum-cost supplier (correlated MIN subquery)
# ---------------------------------------------------------------------------

Q2_TYPE = "LARGE"
Q2_REGION = "EUROPE"
Q2_TOP = 20


def q_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: for each qualifying part, the supplier(s) whose
    account balance equals the per-part MINIMUM across that part's
    suppliers in one region — the correlated-subquery-on-MIN pattern.

    Spark-first plan: the correlated subquery becomes a window MIN over
    the part key on the already-joined (part × supplier) pair list — one
    shuffle on l_partkey, no self-join, no re-aggregation. The part
    type filter and region filter cut both inputs BEFORE the pair
    join; part/supplier/nation/region are all broadcast (≤ thousands of
    rows even at 100 TB fact scale, because the pair list shrinks to the
    filtered parts first). Equality against the windowed MIN is exact:
    both engines compare the same untouched double values.
    """
    ps = _partsupp(spark, sf_dir)
    part = load_table(spark, sf_dir, "part").filter(F.col("p_type") == Q2_TYPE)
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == Q2_REGION)

    joined = (
        ps.join(F.broadcast(part), ps["l_partkey"] == part["p_partkey"])
        .join(F.broadcast(supp), ps["l_suppkey"] == supp["s_suppkey"])
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
    )
    w = Window.partitionBy("p_partkey")
    return (
        joined.withColumn("min_bal", F.min("s_acctbal").over(w))
        .filter(F.col("s_acctbal") == F.col("min_bal"))
        .select("s_acctbal", "s_name", "n_name", "p_partkey", "p_name")
        .orderBy(
            F.desc("s_acctbal"), F.asc("n_name"), F.asc("s_name"), F.asc("p_partkey")
        )
        .limit(Q2_TOP)
    )


_ORACLE_MIN_COST_SUPPLIER = f"""
WITH ps AS ({_SQL_PARTSUPP}),
joined AS (
  SELECT s_acctbal, s_name, n_name, p_partkey, p_name
  FROM ps
  JOIN part ON l_partkey = p_partkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation ON s_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey
  WHERE p_type = '{Q2_TYPE}' AND r_name = '{Q2_REGION}'
)
SELECT s_acctbal, s_name, n_name, p_partkey, p_name
FROM (
  SELECT *, MIN(s_acctbal) OVER (PARTITION BY p_partkey) AS min_bal
  FROM joined
)
WHERE s_acctbal = min_bal
ORDER BY s_acctbal DESC, n_name ASC, s_name ASC, p_partkey ASC
LIMIT {Q2_TOP}
"""


# ---------------------------------------------------------------------------
# Q4 shape: order priority checking (EXISTS semi-join)
# ---------------------------------------------------------------------------

Q4_DATE_LO = "1997-07-01"
Q4_DATE_HI = "1997-10-01"
Q4_LATE_DAYS = 60


def q_order_priority_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: per-priority count of orders in one quarter for
    which EXISTS a lineitem shipped more than {Q4_LATE_DAYS} days after
    the order date.

    EXISTS compiles to a LEFT SEMI join — the probe (lineitem) side is
    never materialized into the output and duplicate matches cost
    nothing. The date window pushes to the orders scan; the non-equi
    lateness condition rides on the semi join itself, so no derived
    column is shuffled. Group-by on the tiny priority domain is a
    near-free final step after the semi join.
    """
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit(Q4_DATE_LO).cast("timestamp"))
        & (F.col("o_orderdate") < F.lit(Q4_DATE_HI).cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    cond = (orders["o_orderkey"] == li["l_orderkey"]) & (
        li["l_shipdate"]
        > orders["o_orderdate"] + F.expr(f"INTERVAL {Q4_LATE_DAYS} DAYS")
    )
    return (
        orders.join(li, cond, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


_ORACLE_ORDER_PRIORITY_COUNTS = f"""
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '{Q4_DATE_LO} 00:00:00'
  AND o_orderdate < TIMESTAMP '{Q4_DATE_HI} 00:00:00'
  AND EXISTS (
    SELECT 1 FROM lineitem
    WHERE l_orderkey = o_orderkey
      AND l_shipdate > o_orderdate + INTERVAL {Q4_LATE_DAYS} DAY
  )
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


# ---------------------------------------------------------------------------
# Q6 shape: forecast revenue change (pure scan-side predicate aggregate)
# ---------------------------------------------------------------------------

Q6_DATE_LO = "1997-01-01"
Q6_DATE_HI = "1998-01-01"
Q6_DISC_LO = 0.05
Q6_DISC_HI = 0.07
Q6_QTY = 24


def q_forecast_revenue_change(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: one global SUM under three conjunctive range
    predicates — the canonical predicate-pushdown benchmark.

    Everything (date range, discount band, quantity cap) lands in
    PushedFilters on the parquet scan, so row groups outside any range
    are skipped via min/max statistics and zero join/shuffle machinery
    runs: scan → partial sum → single final merge. At 100 TB this is the
    query whose cost is purely I/O — exactly as it should be.
    """
    li = load_table(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_shipdate") >= F.lit(Q6_DATE_LO).cast("timestamp"))
        & (F.col("l_shipdate") < F.lit(Q6_DATE_HI).cast("timestamp"))
        & (F.col("l_discount") >= Q6_DISC_LO)
        & (F.col("l_discount") <= Q6_DISC_HI)
        & (F.col("l_quantity") < Q6_QTY)
    ).agg(
        dsum(F.col("l_extendedprice") * F.col("l_discount"), scale=6).alias("revenue")
    )


_ORACLE_FORECAST_REVENUE_CHANGE = f"""
SELECT {sql_dsum("l_extendedprice * l_discount", scale=6)} AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '{Q6_DATE_LO} 00:00:00'
  AND l_shipdate < TIMESTAMP '{Q6_DATE_HI} 00:00:00'
  AND l_discount >= {Q6_DISC_LO} AND l_discount <= {Q6_DISC_HI}
  AND l_quantity < {Q6_QTY}
"""


# ---------------------------------------------------------------------------
# Q8 shape: national market share (conditional-ratio aggregate, dual dim alias)
# ---------------------------------------------------------------------------

Q8_REGION = "ASIA"
Q8_NATION = "NATION_7"
Q8_TYPE = "STANDARD"
Q8_DATE_LO = "1996-01-01"
Q8_DATE_HI = "1998-01-01"


def q_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: the target nation's share of revenue per order
    year, among orders from customers in one region for one part type —
    the same dimension table (nation) joined twice under different roles
    (customer's nation for the region filter, supplier's nation for the
    share numerator).

    Both nation joins and the region/part joins broadcast; the fact-side
    date and type filters push down. The share is a ratio of two exact
    decimal sums per year computed in ONE aggregation over the joined
    fact (a CASE WHEN inside the numerator sum), not two passes.
    """
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit(Q8_DATE_LO).cast("timestamp"))
        & (F.col("o_orderdate") < F.lit(Q8_DATE_HI).cast("timestamp"))
    )
    part = load_table(spark, sf_dir, "part").filter(F.col("p_type") == Q8_TYPE)
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    n_cust = load_table(spark, sf_dir, "nation").alias("n_cust")
    n_supp = (
        load_table(spark, sf_dir, "nation")
        .select(
            F.col("n_nationkey").alias("sn_nationkey"),
            F.col("n_name").alias("supp_nation"),
        )
        .alias("n_supp")
    )
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == Q8_REGION)

    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    joined = (
        li.join(F.broadcast(part), li["l_partkey"] == part["p_partkey"])
        .join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n_cust), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .join(F.broadcast(supp), li["l_suppkey"] == supp["s_suppkey"])
        .join(F.broadcast(n_supp), F.col("s_nationkey") == F.col("sn_nationkey"))
    )
    return (
        joined.groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            (
                dsum(
                    F.when(F.col("supp_nation") == Q8_NATION, vol).otherwise(0.0),
                    scale=6,
                )
                / dsum(vol, scale=6)
            ).alias("mkt_share")
        )
        .orderBy("o_year")
    )


_ORACLE_MARKET_SHARE = f"""
SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year,
       {sql_dsum(f"CASE WHEN sn.n_name = '{Q8_NATION}' THEN l_extendedprice * (1 - l_discount) ELSE 0.0 END", scale=6)}
         / {sql_dsum("l_extendedprice * (1 - l_discount)", scale=6)} AS mkt_share
FROM lineitem
JOIN part ON l_partkey = p_partkey
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation nc ON c_nationkey = nc.n_nationkey
JOIN region ON nc.n_regionkey = r_regionkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation sn ON s_nationkey = sn.n_nationkey
WHERE p_type = '{Q8_TYPE}' AND r_name = '{Q8_REGION}'
  AND o_orderdate >= TIMESTAMP '{Q8_DATE_LO} 00:00:00'
  AND o_orderdate < TIMESTAMP '{Q8_DATE_HI} 00:00:00'
GROUP BY 1
ORDER BY o_year
"""


# ---------------------------------------------------------------------------
# Q9 shape: product-type profit by nation and year
# ---------------------------------------------------------------------------

Q9_NAME_PART = "widget"
Q9_COST_FRACTION = 0.6


def q_product_type_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape: profit per supplier nation per order year over
    parts whose name contains '{Q9_NAME_PART}'. ps_supplycost does not
    exist in this schema; cost is modeled as {Q9_COST_FRACTION} ×
    p_retailprice × quantity (same expression on both engines, so the
    gate still compares full values).

    The substring filter on part cannot push to parquet as a range, but
    part is a broadcast dim so it is evaluated once per part row, not per
    fact row. The aggregation keys (nation, year) are tiny; partial
    aggregation collapses the fact stream before the single shuffle.
    """
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    part = load_table(spark, sf_dir, "part").filter(
        F.col("p_name").contains(Q9_NAME_PART)
    )
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")

    profit = F.col("l_extendedprice") * (1 - F.col("l_discount")) - F.lit(
        Q9_COST_FRACTION
    ) * F.col("p_retailprice") * F.col("l_quantity")
    return (
        li.join(F.broadcast(part), li["l_partkey"] == part["p_partkey"])
        .join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(F.broadcast(supp), li["l_suppkey"] == supp["s_suppkey"])
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(
            F.col("n_name").alias("nation"), F.year("o_orderdate").alias("o_year")
        )
        .agg(dsum(profit, scale=4).alias("sum_profit"))
        .orderBy(F.asc("nation"), F.desc("o_year"))
    )


_ORACLE_PRODUCT_TYPE_PROFIT = f"""
SELECT n_name AS nation, CAST(year(o_orderdate) AS INTEGER) AS o_year,
       {sql_dsum(f"l_extendedprice * (1 - l_discount) - {Q9_COST_FRACTION} * p_retailprice * l_quantity", scale=4)} AS sum_profit
FROM lineitem
JOIN part ON l_partkey = p_partkey
JOIN orders ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
WHERE p_name LIKE '%{Q9_NAME_PART}%'
GROUP BY 1, 2
ORDER BY nation ASC, o_year DESC
"""


# ---------------------------------------------------------------------------
# Q11 shape: important stock value (HAVING vs global scalar subquery)
# ---------------------------------------------------------------------------

Q11_REGION = "AFRICA"
Q11_FRACTION = 0.001


def q_important_stock_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: per-part shipped value from one region's
    suppliers, keeping parts whose value exceeds {Q11_FRACTION} of the
    region's TOTAL — a HAVING clause against a scalar aggregate subquery.

    The scalar total is computed by re-aggregating the per-part aggregate
    (sum of sums — exact, since addends are decimal), broadcast as a
    1-row cross join; Catalyst evaluates the per-part aggregation ONCE
    and reuses the exchange for both branches. Filters (region) cut the
    fact before its only shuffle (on l_partkey).
    """
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == Q11_REGION)

    regional = (
        li.join(F.broadcast(supp), li["l_suppkey"] == supp["s_suppkey"])
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
    )
    per_part = regional.groupBy("l_partkey").agg(
        dsum(F.col("l_extendedprice"), scale=4).alias("part_value")
    )
    total = per_part.agg(
        dsum(F.col("part_value"), scale=4).alias("total_value")
    )
    return (
        per_part.crossJoin(F.broadcast(total))
        .filter(F.col("part_value") > F.col("total_value") * Q11_FRACTION)
        .select("l_partkey", "part_value")
        .orderBy(F.desc("part_value"), F.asc("l_partkey"))
    )


_ORACLE_IMPORTANT_STOCK_VALUE = f"""
WITH regional AS (
  SELECT l_partkey, l_extendedprice
  FROM lineitem
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation ON s_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey
  WHERE r_name = '{Q11_REGION}'
),
per_part AS (
  SELECT l_partkey, {sql_dsum("l_extendedprice", scale=4)} AS part_value
  FROM regional GROUP BY l_partkey
)
SELECT l_partkey, part_value
FROM per_part
WHERE part_value > (
  SELECT {sql_dsum("part_value", scale=4)} FROM per_part
) * {Q11_FRACTION}
ORDER BY part_value DESC, l_partkey ASC
"""


# ---------------------------------------------------------------------------
# Q12 shape: shipping-delay priority counts (conditional counts per bucket)
# ---------------------------------------------------------------------------

Q12_DATE_LO = "1997-01-01"
Q12_DATE_HI = "1998-01-01"
Q12_LATE_DAYS = 90


def q_ship_delay_priority_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: lineitems bucketed by a derived ship-delay class
    (l_shipmode does not exist; LATE/ONTIME versus order date stands in),
    counting high- versus low-priority orders per bucket with CASE-summed
    conditional counts — one pass, one tiny-key aggregation.

    The join carries only (o_orderkey, o_orderdate, o_orderpriority); the
    date filter pushes to the lineitem scan. At 100 TB the delay-class
    derivation is a per-row expression inside whole-stage codegen — no
    UDF, no extra pass.
    """
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit(Q12_DATE_LO).cast("timestamp"))
        & (F.col("l_shipdate") < F.lit(Q12_DATE_HI).cast("timestamp"))
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    delay_class = F.when(
        F.col("l_shipdate")
        > F.col("o_orderdate") + F.expr(f"INTERVAL {Q12_LATE_DAYS} DAYS"),
        "LATE",
    ).otherwise("ONTIME")
    return (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .groupBy(delay_class.alias("delay_class"))
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(high, 0).otherwise(1)).alias("low_line_count"),
        )
        .orderBy("delay_class")
    )


_ORACLE_SHIP_DELAY_PRIORITY_COUNTS = f"""
SELECT CASE WHEN l_shipdate > o_orderdate + INTERVAL {Q12_LATE_DAYS} DAY
            THEN 'LATE' ELSE 'ONTIME' END AS delay_class,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate >= TIMESTAMP '{Q12_DATE_LO} 00:00:00'
  AND l_shipdate < TIMESTAMP '{Q12_DATE_HI} 00:00:00'
GROUP BY 1
ORDER BY delay_class
"""


# ---------------------------------------------------------------------------
# Q13 shape: customer order-count distribution (outer join + double group-by)
# ---------------------------------------------------------------------------

Q13_EXCLUDED_PRIORITY = "5-LOW"


def q_customer_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: distribution of customers by how many qualifying
    orders they placed — LEFT OUTER join (customers with zero orders must
    appear with count 0) followed by a second aggregation over the first
    one's result.

    The order-side filter must live in the JOIN input, not a WHERE after
    the outer join (which would silently turn it inner) — the classic
    outer-join filter-placement trap, handled identically in the oracle.
    First group-by is on c_custkey (reuses the join shuffle); the second
    is over one row per customer on a tiny count domain.
    """
    cust = load_table(spark, sf_dir, "customer").select("c_custkey")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != Q13_EXCLUDED_PRIORITY
    ).select("o_custkey", "o_orderkey")
    per_cust = (
        cust.join(orders, cust["c_custkey"] == orders["o_custkey"], "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


_ORACLE_CUSTOMER_ORDER_DISTRIBUTION = f"""
SELECT c_count, COUNT(*) AS custdist
FROM (
  SELECT c_custkey, COUNT(o_orderkey) AS c_count
  FROM customer
  LEFT JOIN orders ON c_custkey = o_custkey
   AND o_orderpriority <> '{Q13_EXCLUDED_PRIORITY}'
  GROUP BY c_custkey
)
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
"""


# ---------------------------------------------------------------------------
# Q14 shape: promotion revenue share (CASE ratio, single month)
# ---------------------------------------------------------------------------

Q14_DATE_LO = "1997-09-01"
Q14_DATE_HI = "1997-10-01"
Q14_TYPE = "PROMO"


def q_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: percentage of one month's revenue that came from
    '{Q14_TYPE}'-type parts — a CASE-conditional sum over the same rows
    as the denominator, so ONE aggregation produces both.

    part broadcasts; the month filter pushes to the lineitem scan. The
    ratio divides two exact decimal sums (deterministic double result).
    """
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit(Q14_DATE_LO).cast("timestamp"))
        & (F.col("l_shipdate") < F.lit(Q14_DATE_HI).cast("timestamp"))
    )
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_type")
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return li.join(F.broadcast(part), li["l_partkey"] == part["p_partkey"]).agg(
        (
            F.lit(100.0)
            * dsum(F.when(F.col("p_type") == Q14_TYPE, vol).otherwise(0.0), scale=6)
            / dsum(vol, scale=6)
        ).alias("promo_revenue_pct")
    )


_ORACLE_PROMO_REVENUE = f"""
SELECT 100.0 * {sql_dsum(f"CASE WHEN p_type = '{Q14_TYPE}' THEN l_extendedprice * (1 - l_discount) ELSE 0.0 END", scale=6)}
       / {sql_dsum("l_extendedprice * (1 - l_discount)", scale=6)} AS promo_revenue_pct
FROM lineitem
JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '{Q14_DATE_LO} 00:00:00'
  AND l_shipdate < TIMESTAMP '{Q14_DATE_HI} 00:00:00'
"""


# ---------------------------------------------------------------------------
# Q15 shape: top supplier (aggregate view + scalar MAX subquery)
# ---------------------------------------------------------------------------

Q15_DATE_LO = "1997-01-01"
Q15_DATE_HI = "1997-04-01"


def q_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: supplier(s) whose quarterly revenue equals the
    MAXIMUM quarterly revenue — an aggregate "view" consumed twice (once
    for the max, once for the lookup).

    The revenue-per-supplier aggregate is computed once; the scalar max
    re-aggregates it and broadcasts as a 1-row cross join (exchange
    reuse, no unpartitioned window). Equality is safe because revenue is
    an exact decimal sum on both engines. The supplier dim joins
    broadcast AFTER the filter (only the winners reach it).
    """
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit(Q15_DATE_LO).cast("timestamp"))
        & (F.col("l_shipdate") < F.lit(Q15_DATE_HI).cast("timestamp"))
    )
    revenue = li.groupBy("l_suppkey").agg(
        dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), scale=6).alias(
            "total_revenue"
        )
    )
    max_rev = revenue.agg(F.max("total_revenue").alias("max_revenue"))
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        revenue.crossJoin(F.broadcast(max_rev))
        .filter(F.col("total_revenue") == F.col("max_revenue"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


_ORACLE_TOP_SUPPLIER = f"""
WITH revenue AS (
  SELECT l_suppkey,
         {sql_dsum("l_extendedprice * (1 - l_discount)", scale=6)} AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '{Q15_DATE_LO} 00:00:00'
    AND l_shipdate < TIMESTAMP '{Q15_DATE_HI} 00:00:00'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, total_revenue
FROM revenue
JOIN supplier ON l_suppkey = s_suppkey
WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
ORDER BY s_suppkey
"""


# ---------------------------------------------------------------------------
# Q16 shape: parts/supplier relationship counts (NOT IN + COUNT DISTINCT)
# ---------------------------------------------------------------------------

Q16_EXCLUDED_BRAND = "Brand#5"
Q16_SIZES = (1, 9, 14, 19, 23, 36, 45, 49)
Q16_BAD_BAL = 500.0


def q_parts_supplier_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: distinct supplier count per (brand, type, size)
    for an IN-list of sizes, excluding one brand and excluding suppliers
    from a NOT IN subquery (low account balance stands in for the
    complaint-comment filter).

    NOT IN compiles to a LEFT ANTI join against the (tiny, broadcast)
    excluded-supplier list — NULL-free keys make NOT IN and anti-join
    equivalent here. The part dim broadcasts onto the pair list; COUNT
    DISTINCT runs per small (brand,type,size) group where the expand is
    harmless (bounded group fan-out, unlike a global distinct).
    """
    ps = _partsupp(spark, sf_dir)
    part = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != Q16_EXCLUDED_BRAND)
        & (F.col("p_size").isin(*Q16_SIZES))
    )
    bad_supp = load_table(spark, sf_dir, "supplier").filter(
        F.col("s_acctbal") < Q16_BAD_BAL
    ).select("s_suppkey")
    return (
        ps.join(F.broadcast(bad_supp), ps["l_suppkey"] == bad_supp["s_suppkey"], "left_anti")
        .join(F.broadcast(part), F.col("l_partkey") == part["p_partkey"])
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(
            F.desc("supplier_cnt"), F.asc("p_brand"), F.asc("p_type"), F.asc("p_size")
        )
    )


_ORACLE_PARTS_SUPPLIER_COUNTS = f"""
WITH ps AS ({_SQL_PARTSUPP})
SELECT p_brand, p_type, p_size, COUNT(DISTINCT l_suppkey) AS supplier_cnt
FROM ps
JOIN part ON l_partkey = p_partkey
WHERE p_brand <> '{Q16_EXCLUDED_BRAND}'
  AND p_size IN {Q16_SIZES}
  AND l_suppkey NOT IN (
    SELECT s_suppkey FROM supplier WHERE s_acctbal < {Q16_BAD_BAL}
  )
GROUP BY p_brand, p_type, p_size
ORDER BY supplier_cnt DESC, p_brand ASC, p_type ASC, p_size ASC
"""


# ---------------------------------------------------------------------------
# Q18 shape: large-volume customers (IN over GROUP BY ... HAVING)
# ---------------------------------------------------------------------------

Q18_QTY = 250


def q_large_volume_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: orders whose total quantity exceeds {Q18_QTY} —
    an IN subquery over GROUP BY ... HAVING — joined back to customers
    and re-summed per order.

    Spark-first: the HAVING aggregate IS the driving table (no IN
    needed) — aggregate lineitem once on l_orderkey, filter, then join
    orders/customer to the few survivors. The big-side aggregation
    happens BEFORE any join, so the order/customer joins see orders-of-
    magnitude fewer rows; the oracle keeps the literal IN form to prove
    semantic equivalence of the rewrite.
    """
    li = load_table(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(dsum(F.col("l_quantity"), scale=2).alias("total_qty"))
        .filter(F.col("total_qty") > Q18_QTY)
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"
    )
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    return (
        big.join(orders, big["l_orderkey"] == orders["o_orderkey"])
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .select(
            "c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice",
            "total_qty",
        )
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderdate"), F.asc("o_orderkey"))
    )


_ORACLE_LARGE_VOLUME_CUSTOMER = f"""
SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
       {sql_dsum("l_quantity", scale=2)} AS total_qty
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON o_orderkey = l_orderkey
WHERE o_orderkey IN (
  SELECT l_orderkey FROM lineitem
  GROUP BY l_orderkey
  HAVING {sql_dsum("l_quantity", scale=2)} > {Q18_QTY}
)
GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
ORDER BY o_totalprice DESC, o_orderdate ASC, o_orderkey ASC
"""


# ---------------------------------------------------------------------------
# Q19 shape: discounted revenue under disjunctive predicates
# ---------------------------------------------------------------------------

Q19_ARMS = (
    ("Brand#12", 1, 5, 1.0, 11.0),
    ("Brand#23", 1, 10, 10.0, 20.0),
    ("Brand#34", 1, 15, 20.0, 30.0),
)


def q_discounted_revenue_disjunctive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: one revenue sum under an OR of three AND-groups
    mixing part attributes (brand, size) and lineitem attributes
    (quantity) — the disjunctive-pushdown stress test.

    part broadcasts; the OR lives in the post-join filter where codegen
    evaluates it per row. The lineitem scan still gets a USEFUL pushed
    predicate: the quantity bound below the weakest arm's minimum
    (l_quantity >= min of all arms) — the standard derived-conjunct
    trick for OR predicates that Catalyst cannot split itself.
    """
    li = load_table(spark, sf_dir, "lineitem")
    min_qty = min(arm[3] for arm in Q19_ARMS)
    li = li.filter(F.col("l_quantity") >= min_qty)
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")

    arm_exprs = None
    for brand, size_lo, size_hi, qty_lo, qty_hi in Q19_ARMS:
        arm = (
            (F.col("p_brand") == brand)
            & (F.col("p_size") >= size_lo)
            & (F.col("p_size") <= size_hi)
            & (F.col("l_quantity") >= qty_lo)
            & (F.col("l_quantity") <= qty_hi)
        )
        arm_exprs = arm if arm_exprs is None else (arm_exprs | arm)
    return (
        li.join(F.broadcast(part), li["l_partkey"] == part["p_partkey"])
        .filter(arm_exprs)
        .agg(
            dsum(
                F.col("l_extendedprice") * (1 - F.col("l_discount")), scale=6
            ).alias("revenue")
        )
    )


_ORACLE_DISCOUNTED_REVENUE_DISJUNCTIVE = f"""
SELECT {sql_dsum("l_extendedprice * (1 - l_discount)", scale=6)} AS revenue
FROM lineitem
JOIN part ON l_partkey = p_partkey
WHERE {" OR ".join(
    f"(p_brand = '{b}' AND p_size BETWEEN {slo} AND {shi}"
    f" AND l_quantity BETWEEN {qlo} AND {qhi})"
    for b, slo, shi, qlo, qhi in Q19_ARMS
)}
"""


# ---------------------------------------------------------------------------
# Q20 shape: potential part promotion (nested IN over aggregate HAVING)
# ---------------------------------------------------------------------------

Q20_NAME_PREFIX = "red"
Q20_DATE_LO = "1997-01-01"
Q20_DATE_HI = "1998-01-01"
Q20_QTY = 200
Q20_REGION = "ASIA"


def q_potential_part_promotion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: suppliers in one region who shipped more than
    {Q20_QTY} units of '{Q20_NAME_PREFIX}%'-named parts in one year — a
    supplier IN (aggregate-HAVING subquery) with a nested part-name IN.

    The inner aggregate (per-supplier shipped quantity of matching
    parts) aggregates the fact FIRST; the qualifying supplier-key set is
    tiny and drives a LEFT SEMI join against the supplier dim, which then
    broadcasts to nation/region. No correlated re-execution: the
    subquery runs once, exactly like DuckDB's decorrelated plan.
    """
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit(Q20_DATE_LO).cast("timestamp"))
        & (F.col("l_shipdate") < F.lit(Q20_DATE_HI).cast("timestamp"))
    )
    part = load_table(spark, sf_dir, "part").filter(
        F.col("p_name").startswith(Q20_NAME_PREFIX)
    ).select("p_partkey")
    qualifying = (
        li.join(F.broadcast(part), li["l_partkey"] == part["p_partkey"])
        .groupBy("l_suppkey")
        .agg(dsum(F.col("l_quantity"), scale=2).alias("red_qty"))
        .filter(F.col("red_qty") > Q20_QTY)
        .select("l_suppkey")
    )
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == Q20_REGION)
    return (
        supp.join(qualifying, supp["s_suppkey"] == qualifying["l_suppkey"], "left_semi")
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("s_name", "s_acctbal", "n_name")
        .orderBy("s_name")
    )


_ORACLE_POTENTIAL_PART_PROMOTION = f"""
SELECT s_name, s_acctbal, n_name
FROM supplier
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE r_name = '{Q20_REGION}'
  AND s_suppkey IN (
    SELECT l_suppkey FROM lineitem
    WHERE l_partkey IN (
      SELECT p_partkey FROM part WHERE p_name LIKE '{Q20_NAME_PREFIX}%'
    )
      AND l_shipdate >= TIMESTAMP '{Q20_DATE_LO} 00:00:00'
      AND l_shipdate < TIMESTAMP '{Q20_DATE_HI} 00:00:00'
    GROUP BY l_suppkey
    HAVING {sql_dsum("l_quantity", scale=2)} > {Q20_QTY}
  )
ORDER BY s_name
"""


# ---------------------------------------------------------------------------
# Q21 shape: suppliers who kept orders waiting (EXISTS + NOT EXISTS)
# ---------------------------------------------------------------------------

Q21_LATE_DAYS = 120
Q21_REGION = "EUROPE"
Q21_TOP = 25


def q_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape: for finished multi-supplier orders, count per
    supplier the orders where that supplier was the ONLY late one —
    the EXISTS (another supplier on the order) + NOT EXISTS (another
    LATE supplier on the order) double-correlation.

    Spark-first decorrelation: ONE aggregation per order computes both
    correlated facts — distinct supplier count (EXISTS ⇔ > 1) and
    distinct LATE supplier count (NOT EXISTS ⇔ exactly 1) — replacing
    two correlated probes with a single reused shuffle on l_orderkey.
    The late-supplier pair list joins back to it, keeping only
    single-late-supplier orders; region/nation broadcast at the end onto
    the per-supplier counts (100s of rows).
    """
    li = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_suppkey", "l_shipdate")
    )
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderstatus") == "F"
    ).select("o_orderkey", "o_orderdate")
    li = li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
    late = F.col("l_shipdate") > F.col("o_orderdate") + F.expr(
        f"INTERVAL {Q21_LATE_DAYS} DAYS"
    )
    order_stats = li.groupBy("l_orderkey").agg(
        F.countDistinct("l_suppkey").alias("n_supp"),
        F.countDistinct(F.when(late, F.col("l_suppkey"))).alias("n_late_supp"),
    )
    late_pairs = li.filter(late).select("l_orderkey", "l_suppkey").distinct()
    sole_late = (
        late_pairs.join(
            order_stats.filter(
                (F.col("n_supp") > 1) & (F.col("n_late_supp") == 1)
            ).select("l_orderkey"),
            "l_orderkey",
            "left_semi",
        )
        .groupBy("l_suppkey")
        .agg(F.count(F.lit(1)).alias("numwait"))
    )
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == Q21_REGION)
    return (
        sole_late.join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("s_name", "numwait")
        .orderBy(F.desc("numwait"), F.asc("s_name"))
        .limit(Q21_TOP)
    )


_ORACLE_WAITING_SUPPLIERS = f"""
WITH li AS (
  SELECT l_orderkey, l_suppkey,
         l_shipdate > o_orderdate + INTERVAL {Q21_LATE_DAYS} DAY AS is_late
  FROM lineitem
  JOIN orders ON l_orderkey = o_orderkey
  WHERE o_orderstatus = 'F'
),
order_stats AS (
  SELECT l_orderkey,
         COUNT(DISTINCT l_suppkey) AS n_supp,
         COUNT(DISTINCT CASE WHEN is_late THEN l_suppkey END) AS n_late_supp
  FROM li GROUP BY l_orderkey
),
sole_late AS (
  SELECT DISTINCT li.l_orderkey, li.l_suppkey
  FROM li
  JOIN order_stats os ON li.l_orderkey = os.l_orderkey
  WHERE li.is_late AND os.n_supp > 1 AND os.n_late_supp = 1
)
SELECT s_name, COUNT(*) AS numwait
FROM sole_late
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE r_name = '{Q21_REGION}'
GROUP BY s_name
ORDER BY numwait DESC, s_name ASC
LIMIT {Q21_TOP}
"""


# ---------------------------------------------------------------------------
# Q22 shape: global sales opportunity (scalar avg subquery + NOT EXISTS)
# ---------------------------------------------------------------------------

Q22_SEGMENTS = ("1", "3", "5", "7", "9")
Q22_SINCE = "2000-01-01"


def q_global_sales_opportunity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: per name-digit segment (phone country code stands
    in as the last digit of c_name), count and total balance of
    above-average-balance customers with NO orders since {Q22_SINCE}
    (every customer in this dataset has SOME order, so "lapsed since a
    cutoff" keeps the NOT EXISTS non-degenerate) — scalar AVG subquery
    plus NOT EXISTS anti-join.

    The scalar average (over positive balances) broadcasts as a 1-row
    cross join; NOT EXISTS is a LEFT ANTI join against the filtered
    orders customer-key projection (never materializes order rows; the
    date filter pushes to the orders scan). Both customer-side filters
    cut the build side BEFORE the anti join probes the big table.
    """
    cust = load_table(spark, sf_dir, "customer").withColumn(
        "cntry", F.substring(F.col("c_name"), -1, 1)
    ).filter(F.col("cntry").isin(*Q22_SEGMENTS))
    avg_bal = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_acctbal") > 0.0)
        .agg((dsum(F.col("c_acctbal"), scale=4) / F.count(F.lit(1))).alias("avg_bal"))
    )
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit(Q22_SINCE).cast("timestamp")
    ).select("o_custkey")
    return (
        cust.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(orders, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .groupBy("cntry")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            dsum(F.col("c_acctbal"), scale=4).alias("totacctbal"),
        )
        .orderBy("cntry")
    )


_ORACLE_GLOBAL_SALES_OPPORTUNITY = f"""
SELECT cntry, COUNT(*) AS numcust, {sql_dsum("c_acctbal", scale=4)} AS totacctbal
FROM (
  SELECT right(c_name, 1) AS cntry, c_custkey, c_acctbal
  FROM customer
  WHERE right(c_name, 1) IN {Q22_SEGMENTS}
    AND c_acctbal > (
      SELECT {sql_dsum("c_acctbal", scale=4)} / COUNT(*)
      FROM customer WHERE c_acctbal > 0.0
    )
    AND NOT EXISTS (
      SELECT 1 FROM orders
      WHERE o_custkey = c_custkey
        AND o_orderdate >= TIMESTAMP '{Q22_SINCE} 00:00:00'
    )
)
GROUP BY cntry
ORDER BY cntry
"""


# ---------------------------------------------------------------------------
# Per-group exact fulfillment-time percentiles (grouped discrete quantiles)
# ---------------------------------------------------------------------------

FULFILL_QS = (0.5, 0.9)


def q_fulfillment_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-priority EXACT fulfillment-time percentiles: order fulfillment
    = days from order date to its LAST line shipment; per priority class,
    the discrete p50/p90 (real data values at rank ceil(q·n)) plus the
    order count — the ops-SLA report ("90% of urgent orders fully ship
    within N days").

    GROUPED exact quantiles, complementing the global bucketed-rank
    entry: durations collapse to one row per order first (fact-sized
    work), then a per-priority window rank picks the target-rank rows —
    partitioned windows, no single-task sort. Integer day durations, so
    every value is exact; the rank formula (ceil(q·n), both ceil's over
    the same IEEE product) is mirrored verbatim in the oracle, and ties
    at the target rank don't matter because the VALUE at the rank is
    tie-invariant."""
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    durs = (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .groupBy("o_orderkey", "o_orderpriority")
        .agg(
            F.datediff(
                F.max(F.to_date("l_shipdate")), F.first(F.to_date("o_orderdate"))
            ).alias("dur_days")
        )
    )
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.asc("dur_days"), F.asc("o_orderkey")
    )
    ranked = durs.select(
        "o_orderpriority",
        "dur_days",
        F.row_number().over(w).alias("rk"),
        F.count(F.lit(1)).over(Window.partitionBy("o_orderpriority")).alias("n"),
    )
    picks = [
        ranked.filter(
            F.col("rk") == F.ceil(F.lit(q) * F.col("n")).cast("long")
        ).select(
            "o_orderpriority",
            F.col("n").alias("n_orders"),
            F.col("dur_days").alias(f"p{int(q * 100)}_days"),
        )
        for q in FULFILL_QS
    ]
    out = picks[0]
    for p in picks[1:]:
        out = out.join(p.drop("n_orders"), "o_orderpriority")
    return out.orderBy("o_orderpriority")


_ORACLE_FULFILLMENT_PERCENTILES = f"""
WITH durs AS (
  SELECT o_orderkey, o_orderpriority,
         date_diff('day', CAST(MIN(o_orderdate) AS DATE),
                   CAST(MAX(l_shipdate) AS DATE)) AS dur_days
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  GROUP BY o_orderkey, o_orderpriority
), ranked AS (
  SELECT o_orderpriority, dur_days,
         ROW_NUMBER() OVER (PARTITION BY o_orderpriority
                            ORDER BY dur_days ASC, o_orderkey ASC) AS rk,
         COUNT(*) OVER (PARTITION BY o_orderpriority) AS n
  FROM durs
)
SELECT p50.o_orderpriority,
       p50.n AS n_orders,
       p50.dur_days AS p50_days,
       p90.dur_days AS p90_days
FROM (SELECT * FROM ranked WHERE rk = CAST(ceil(0.5 * n) AS BIGINT)) p50
JOIN (SELECT * FROM ranked WHERE rk = CAST(ceil(0.9 * n) AS BIGINT)) p90
  USING (o_orderpriority)
ORDER BY o_orderpriority
"""


# ---------------------------------------------------------------------------
# Month-over-month revenue mix shift (share-of-total trend by category)
# ---------------------------------------------------------------------------

def q_revenue_mix_shift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Month-over-month revenue MIX shift by part type: each month's
    revenue share per type, and the delta versus the previous month — the
    "what changed in the mix" report behind every category-management
    review. Share-of-total via a window SUM over the (month × type)
    aggregate partitioned by month; the MoM delta via LAG over months
    within each type — two windows over the tiny aggregate, one fact
    pass. Shares divide exact decimal sums; the share delta subtracts two
    deterministic doubles (identical operand bits both engines)."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_type")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    monthly = (
        li.join(F.broadcast(part), li["l_partkey"] == part["p_partkey"])
        .groupBy(
            F.date_trunc("month", F.col("l_shipdate")).cast("date").alias("month"),
            "p_type",
        )
        .agg(dsum(rev, scale=4).alias("revenue"))
    )
    w_month = Window.partitionBy("month")
    w_type = Window.partitionBy("p_type").orderBy(F.asc("month"))
    # month total as a DECIMAL window sum (association-free; a double
    # window sum evaluates sequentially in Spark but via segment trees in
    # DuckDB) cast back to double for one identical IEEE division
    shared = monthly.withColumn(
        "share",
        F.col("revenue")
        / F.sum(F.col("revenue").cast("decimal(38,4)")).over(w_month).cast("double"),
    )
    return (
        shared.withColumn("prev_share", F.lag("share").over(w_type))
        .select(
            "month",
            "p_type",
            "revenue",
            "share",
            (F.col("share") - F.col("prev_share")).alias("share_delta"),
        )
        .orderBy("month", "p_type")
    )


_ORACLE_REVENUE_MIX_SHIFT = f"""
WITH monthly AS (
  SELECT CAST(date_trunc('month', l_shipdate) AS DATE) AS month, p_type,
         {sql_dsum("l_extendedprice * (1 - l_discount)", scale=4)} AS revenue
  FROM lineitem JOIN part ON l_partkey = p_partkey
  GROUP BY 1, 2
), shared AS (
  SELECT month, p_type, revenue,
         revenue / CAST(SUM(CAST(revenue AS DECIMAL(38,4)))
                          OVER (PARTITION BY month) AS DOUBLE) AS share
  FROM monthly
)
SELECT month, p_type, revenue, share,
       share - lag(share) OVER (PARTITION BY p_type ORDER BY month ASC)
         AS share_delta
FROM shared
ORDER BY month, p_type
"""


# ---------------------------------------------------------------------------
# Supplier scorecard (multi-measure composite KPI table)
# ---------------------------------------------------------------------------

SCORECARD_LATE_DAYS = 90


def q_supplier_scorecard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Supplier operational scorecard: per supplier, revenue, volume,
    return rate, late-shipment rate (> {SCORECARD_LATE_DAYS} days after
    order), average discount given, and distinct parts carried — the
    multi-measure KPI table an ops dashboard refreshes nightly. Every
    measure computes in ONE pass over the joined fact (conditional sums
    — no per-measure scans), with the order join carrying only the
    order date. Ratios divide exact decimal/integer partials; the
    two-phase distinct-parts count avoids the countDistinct expand on
    the revenue measures sharing the aggregation."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    joined = li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
    late = F.col("l_shipdate") > F.col("o_orderdate") + F.expr(
        f"INTERVAL {SCORECARD_LATE_DAYS} DAYS"
    )
    returned = F.col("l_returnflag") == "R"
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    scored = joined.groupBy("l_suppkey").agg(
        F.count(F.lit(1)).alias("n_items"),
        dsum(rev, scale=4).alias("revenue"),
        F.countDistinct("l_partkey").alias("n_parts"),
        (F.sum(F.when(returned, 1).otherwise(0)).cast("double") / F.count(F.lit(1))).alias(
            "return_rate"
        ),
        (F.sum(F.when(late, 1).otherwise(0)).cast("double") / F.count(F.lit(1))).alias(
            "late_rate"
        ),
        (dsum("l_discount", scale=8) / F.count(F.lit(1))).alias("avg_discount"),
    )
    return (
        scored.join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .select(
            "s_suppkey", "s_name", "n_items", "revenue", "n_parts",
            "return_rate", "late_rate", "avg_discount",
        )
        .orderBy("s_suppkey")
    )


_ORACLE_SUPPLIER_SCORECARD = f"""
SELECT s_suppkey, s_name,
       COUNT(*) AS n_items,
       {sql_dsum("l_extendedprice * (1 - l_discount)", scale=4)} AS revenue,
       COUNT(DISTINCT l_partkey) AS n_parts,
       CAST(SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS DOUBLE)
         / COUNT(*) AS return_rate,
       CAST(SUM(CASE WHEN l_shipdate > o_orderdate + INTERVAL {SCORECARD_LATE_DAYS} DAY
                     THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*) AS late_rate,
       {sql_dsum("l_discount", scale=8)} / COUNT(*) AS avg_discount
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
GROUP BY s_suppkey, s_name
ORDER BY s_suppkey
"""


# ---------------------------------------------------------------------------
# RFM customer segmentation (recency / frequency / monetary quintiles)
# ---------------------------------------------------------------------------

RFM_BUCKETS = 5


def q_customer_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM segmentation — the classic CRM/BI workload: per customer,
    recency (days since last order, against the dataset's max date),
    frequency (order count), monetary (exact total spend), each cut into
    {RFM_BUCKETS} NTILE buckets (1 = best), then the segment-cell profile
    (customer count + exact cell spend).

    Determinism: every NTILE ORDER BY carries c_custkey as the tiebreak —
    without it equal metric values make bucket boundaries
    partition-order-dependent. Scale shape: the fact collapses to ONE row
    per customer before any window; the NTILEs are computed in closed
    form from the ``_cum_prev`` bucketed global rank (r14 optimization —
    no single-task sort; the plain-NTILE oracle proves value-identity).
    The max-date scalar broadcasts."""
    orders = load_table(spark, sf_dir, "orders")
    per_cust = orders.groupBy("o_custkey").agg(
        F.max("o_orderdate").alias("last_order"),
        F.count(F.lit(1)).alias("frequency"),
        dsum("o_totalprice", scale=4).alias("monetary"),
    )
    gmax = orders.agg(F.max("o_orderdate").alias("gmax"))
    scored = per_cust.crossJoin(F.broadcast(gmax)).withColumn(
        "recency_days", F.datediff(F.col("gmax"), F.col("last_order"))
    )
    # NTILE from the bucketed global rank (r14 optimization — no
    # single-task sort): with n rows and k tiles, q = n DIV k, r = n MOD k,
    # the first r tiles hold q+1 rows — the exact NTILE definition both
    # engines implement, reproduced from (rn, n) in closed form. DESC
    # orders rank by the exact negation (long/double negation is exact).
    def _ntile_col(rn, k):
        n = F.col("_n")
        q = F.floor(n / F.lit(k)).cast("long")
        r = n % F.lit(k)
        big = r * (q + F.lit(1))
        return (
            F.when(rn <= big, F.floor((rn - 1) / (q + F.lit(1))))
            .otherwise(r + F.floor((rn - big - F.lit(1)) / q))
            + F.lit(1)
        ).cast("int")

    base = (
        scored.withColumn("_negf", -F.col("frequency"))
        .withColumn("_negm", -F.col("monetary"))
        .localCheckpoint(eager=False)
    )
    # three INDEPENDENT bucketed ranks over the materialized per-customer
    # frame (not a nested chain — each axis reads the checkpointed blocks,
    # and the three rank pipelines can overlap), joined back on custkey.
    # n (the NTILE closed form's row count) comes from the r-axis
    # decomposition's own offset table (with_totals, r15 optimization)
    # instead of a separate re-aggregation of the per-customer frame.
    r_t = _cum_prev(
        base, ["recency_days", "o_custkey"], {"_rp_r": F.lit(1)}, with_totals=True
    ).select("o_custkey", "_rp_r", F.col("_rp_r_tot").alias("_n"))
    # the frequency axis is TIE-HEAVY (the r15 skew audit measured 13% of
    # all customers sharing one order-count bucket at sf0.1 — a grid on
    # the count alone cannot split ties), so its rank uses the two-level
    # tie decomposition: distinct-count offsets + within-count custkey
    # rank. Value-identical (lexicographic-rank definition; same oracle).
    f_t = _rank_prev_tied(base, "_negf", ["o_custkey"], "_rp_f").select(
        "o_custkey", "_rp_f"
    )
    m_t = _cum_prev(base, ["_negm", "o_custkey"], {"_rp_m": F.lit(1)}).select(
        "o_custkey", "monetary", "_rp_m"
    )
    ranked3 = m_t.join(r_t, "o_custkey").join(f_t, "o_custkey")
    rfm = ranked3.select(
        "o_custkey",
        "monetary",
        _ntile_col(F.col("_rp_r") + F.lit(1), RFM_BUCKETS).alias("r_score"),
        _ntile_col(F.col("_rp_f") + F.lit(1), RFM_BUCKETS).alias("f_score"),
        _ntile_col(F.col("_rp_m") + F.lit(1), RFM_BUCKETS).alias("m_score"),
    )
    return (
        rfm.groupBy("r_score", "f_score", "m_score")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            dsum("monetary", scale=4).alias("cell_value"),
        )
        .orderBy("r_score", "f_score", "m_score")
    )


_ORACLE_CUSTOMER_RFM_SEGMENTS = f"""
WITH per_cust AS (
  SELECT o_custkey,
         MAX(o_orderdate) AS last_order,
         COUNT(*) AS frequency,
         {sql_dsum("o_totalprice", scale=4)} AS monetary
  FROM orders GROUP BY o_custkey
), scored AS (
  SELECT *, date_diff('day', CAST(last_order AS DATE),
                      (SELECT CAST(MAX(o_orderdate) AS DATE) FROM orders)) AS recency_days
  FROM per_cust
), rfm AS (
  SELECT o_custkey, monetary,
         NTILE({RFM_BUCKETS}) OVER (ORDER BY recency_days ASC, o_custkey ASC) AS r_score,
         NTILE({RFM_BUCKETS}) OVER (ORDER BY frequency DESC, o_custkey ASC) AS f_score,
         NTILE({RFM_BUCKETS}) OVER (ORDER BY monetary DESC, o_custkey ASC) AS m_score
  FROM scored
)
SELECT r_score, f_score, m_score,
       COUNT(*) AS n_customers,
       {sql_dsum("monetary", scale=4)} AS cell_value
FROM rfm
GROUP BY 1, 2, 3
ORDER BY r_score, f_score, m_score
"""


# ---------------------------------------------------------------------------
# ABC / Pareto classification (cumulative-share cut on exact decimals)
# ---------------------------------------------------------------------------

ABC_A_PCT = 80
ABC_B_PCT = 95


def q_abc_pareto_class(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ABC (Pareto) classification of parts by revenue: class A = parts
    whose running revenue share stays within {ABC_A_PCT}%, B to
    {ABC_B_PCT}%, C the tail — inventory analytics' 80/15/5 cut.

    The trap this implementation exists to avoid: a running DOUBLE sum
    over an ORDER BY is evaluated sequentially by Spark but via segment
    trees by DuckDB — different association orders, last-ulp drift, and a
    class flips at the boundary. Both the running sum and the total here
    are DECIMAL (integer arithmetic, association-free), and the share
    thresholds compare by cross-multiplication (cum·100 ≤ total·{ABC_A_PCT})
    — no division, no float anywhere near the cut. Ordering ties break on
    p_partkey. Per-part revenue collapses the fact first; the running
    share is the ``_cum_prev`` bucketed cumulative over the part-domain
    aggregate (r14 optimization — no single-task sort)."""
    li = load_table(spark, sf_dir, "lineitem")
    per_part = li.groupBy("l_partkey").agg(
        dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), scale=4)
        .cast("decimal(38,4)")
        .alias("rev")
    )
    total = per_part.agg(F.sum("rev").alias("total_rev"))
    classed = (
        _cum_prev(
            per_part.withColumn("_negrev", -F.col("rev")),
            ["_negrev", "l_partkey"],
            {"_cp": F.col("rev")},
            materialize=True,
        )
        .withColumn("cum", F.col("_cp") + F.col("rev"))
        .crossJoin(F.broadcast(total))
        .withColumn(
            "abc_class",
            F.when(F.col("cum") * 100 <= F.col("total_rev") * ABC_A_PCT, "A")
            .when(F.col("cum") * 100 <= F.col("total_rev") * ABC_B_PCT, "B")
            .otherwise("C"),
        )
    )
    return (
        classed.groupBy("abc_class")
        .agg(
            F.count(F.lit(1)).alias("n_parts"),
            F.sum("rev").cast("double").alias("class_revenue"),
            (
                F.sum("rev").cast("double") / F.first("total_rev").cast("double")
            ).alias("revenue_share"),
        )
        .orderBy("abc_class")
    )


_ORACLE_ABC_PARETO_CLASS = f"""
WITH per_part AS (
  SELECT l_partkey,
         CAST({sql_dsum("l_extendedprice * (1 - l_discount)", scale=4)} AS DECIMAL(38,4)) AS rev
  FROM lineitem GROUP BY l_partkey
), classed AS (
  SELECT l_partkey, rev,
         SUM(rev) OVER (ORDER BY rev DESC, l_partkey ASC
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
         (SELECT SUM(rev) FROM per_part) AS total_rev
  FROM per_part
)
SELECT CASE WHEN cum * 100 <= total_rev * {ABC_A_PCT} THEN 'A'
            WHEN cum * 100 <= total_rev * {ABC_B_PCT} THEN 'B'
            ELSE 'C' END AS abc_class,
       COUNT(*) AS n_parts,
       CAST(SUM(rev) AS DOUBLE) AS class_revenue,
       CAST(SUM(rev) AS DOUBLE) / CAST(MAX(total_rev) AS DOUBLE) AS revenue_share
FROM classed
GROUP BY 1
ORDER BY abc_class
"""


# ---------------------------------------------------------------------------
# Market concentration: Herfindahl–Hirschman index + CR4 per nation
# ---------------------------------------------------------------------------


def q_market_concentration_hhi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Supplier market concentration per nation: the Herfindahl–Hirschman
    index HHI = Σ share_i² (×10,000 in the antitrust convention) and the
    CR4 top-4 concentration ratio over supplier revenue — the standard
    pair a marketplace-health dashboard tracks.

    Exactness: supplier revenue is integer 10⁻⁴-units (price has 2
    decimals, discount 2 → price·(1−disc) is exact at 4), so Σshare² =
    Σc_i²/C² computes from EXACT integers — the squares run in
    DECIMAL(38,0) (c_i ~10¹¹ at sf1 ⇒ c_i² ~10²² overflows BIGINT but is
    exact integer decimal math), and the two final double conversions +
    one division are correctly rounded. CR4 is a rank-window top-4 sum
    of the same integers. No double→decimal cast of a full-precision
    value anywhere (the quantile-grid rounding-mode lesson).

    Scale shape: one supplier-keyed agg (map-side combinable), one
    broadcast nation dim join, one per-nation agg + a per-nation rank
    window over the supplier-count-sized frame."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_suppkey",
        F.round(
            F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount")) * 10000, 0
        )
        .cast("bigint")
        .alias("rev_fp"),
    )
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nation = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    per_supp = (
        li.groupBy("l_suppkey")
        .agg(F.sum("rev_fp").alias("c"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("n_name", "c")
    )
    r = F.row_number().over(
        # ties on c may rank arbitrarily — the top-4 SUM is invariant to
        # permutations of equal values, so the output stays deterministic
        Window.partitionBy("n_name").orderBy(F.col("c").desc())
    )
    ranked = per_supp.withColumn("rk", r)
    agg = ranked.groupBy("n_name").agg(
        F.count(F.lit(1)).alias("n_suppliers"),
        F.sum("c").alias("total"),
        F.sum(F.col("c").cast("decimal(38,0)") * F.col("c").cast("decimal(38,0)")).alias(
            "ss"
        ),
        F.sum(F.when(F.col("rk") <= 4, F.col("c")).otherwise(F.lit(0))).alias("top4"),
    )
    tot = F.col("total").cast("double")
    return agg.select(
        "n_name",
        F.col("n_suppliers").cast("long").alias("n_suppliers"),
        (F.col("ss").cast("double") / (tot * tot) * F.lit(10000.0)).alias("hhi"),
        (F.col("top4").cast("double") / tot).alias("cr4"),
    ).orderBy("n_name")


_ORACLE_HHI = """
WITH per_supp AS (
  SELECT n.n_name, SUM(CAST(ROUND(l_extendedprice * (1.0 - l_discount) * 10000, 0) AS BIGINT)) AS c
  FROM lineitem l
  JOIN supplier s ON l.l_suppkey = s.s_suppkey
  JOIN nation n ON s.s_nationkey = n.n_nationkey
  GROUP BY n.n_name, l.l_suppkey
), ranked AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY n_name ORDER BY c DESC) AS rk
  FROM per_supp
), agg AS (
  SELECT n_name, COUNT(*) AS n_suppliers, SUM(c) AS total,
         SUM(CAST(c AS DECIMAL(38,0)) * CAST(c AS DECIMAL(38,0))) AS ss,
         SUM(CASE WHEN rk <= 4 THEN c ELSE 0 END) AS top4
  FROM ranked GROUP BY n_name
)
SELECT n_name, CAST(n_suppliers AS BIGINT) AS n_suppliers,
       CAST(ss AS DOUBLE) / (CAST(total AS DOUBLE) * CAST(total AS DOUBLE)) * 10000.0 AS hhi,
       CAST(top4 AS DOUBLE) / CAST(total AS DOUBLE) AS cr4
FROM agg
ORDER BY n_name
"""


# ---------------------------------------------------------------------------
# Year-over-year revenue growth (lag window on exact cents)
# ---------------------------------------------------------------------------


def q_revenue_yoy_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Year-over-year revenue growth per nation — the headline dashboard
    trend metric (the reference's monthly trend chart, SURVEY.md §2.7,
    generalized to the period-over-period comparison every BI tool ships).

    Exactness: yearly revenue is exact integer cents; growth is ONE
    division of two exact integers per row (the first year is NULL in
    both engines — no epsilon guards needed since revenue > 0). Scale
    shape: one map-side-combinable hash agg to |nation|×|year| cells; the
    lag window runs on that domain-sized frame, never raw rows.
    """
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    nation = load_table(spark, sf_dir, "nation")
    yearly = (
        orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("n_name", F.year("o_orderdate").alias("o_year"))
        .agg(
            F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("bigint"))
            .cast("long")
            .alias("revenue_cents")
        )
    )
    w = Window.partitionBy("n_name").orderBy("o_year")
    prev = F.lag("revenue_cents").over(w)
    growth = (F.col("revenue_cents") - prev).cast("double") / prev.cast("double")
    return yearly.select(
        "n_name",
        F.col("o_year").cast("int").alias("o_year"),
        "revenue_cents",
        growth.alias("yoy_growth"),
    ).orderBy("n_name", "o_year")


_ORACLE_YOY = """
WITH yearly AS (
  SELECT n_name, YEAR(o_orderdate) AS o_year,
         CAST(SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT)
           AS revenue_cents
  FROM orders
  JOIN customer ON o_custkey = c_custkey
  JOIN nation ON c_nationkey = n_nationkey
  GROUP BY 1, 2
)
SELECT n_name, CAST(o_year AS INTEGER) AS o_year, revenue_cents,
       CAST(revenue_cents - LAG(revenue_cents) OVER w AS DOUBLE)
         / CAST(LAG(revenue_cents) OVER w AS DOUBLE) AS yoy_growth
FROM yearly
WINDOW w AS (PARTITION BY n_name ORDER BY o_year)
ORDER BY n_name, o_year
"""


# ---------------------------------------------------------------------------
# SLA on-time proportion with Wilson 95% interval
# ---------------------------------------------------------------------------

SLA_DAYS = 75
_WILSON_Z = 1.959963984540054  # z_{0.975}, Python-folded literal


def q_sla_wilson_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-supplier-nation SLA attainment: share of line items shipped
    within {d} days of order, with the WILSON 95% score interval — the
    interval that stays honest at extreme proportions and small nations
    (the naive Wald interval the reference's ratio KPIs would imply can
    exceed [0,1] and collapses to zero width at p̂∈{{0,1}}).

    Determinism: k and n are exact counts, z is one folded double
    literal, and center/half-width are fixed-shape IEEE expressions
    (division, one sqrt) — bit-identical across engines. Scale shape:
    one fact-fact equi-join (sort-merge on orderkey at 100 TB — both
    sides clustered on the key) into a map-side-combinable hash agg to
    ≤25 rows; the interval math runs on the result rows.
    """
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    sup = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nation = load_table(spark, sf_dir, "nation")
    ontime = (
        F.datediff(F.col("l_shipdate"), F.col("o_orderdate")) <= SLA_DAYS
    ).cast("long")
    agg = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(sup), li.l_suppkey == sup.s_suppkey)
        .join(F.broadcast(nation), sup.s_nationkey == nation.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_items"),
            F.sum(ontime).cast("long").alias("n_ontime"),
        )
    )
    nd = F.col("n_items").cast("double")
    kd = F.col("n_ontime").cast("double")
    z = F.lit(_WILSON_Z)
    phat = kd / nd
    denom = F.lit(1.0) + z * z / nd
    # numerator terms kept UNdivided until one final division so the IEEE
    # op sequence matches the oracle exactly ((A±B)/d, never A/d ± B/d)
    center_num = phat + z * z / (F.lit(2.0) * nd)
    half_num = z * F.sqrt(
        phat * (F.lit(1.0) - phat) / nd + z * z / (F.lit(4.0) * nd * nd)
    )
    return agg.select(
        "n_name",
        "n_items",
        "n_ontime",
        phat.alias("p_ontime"),
        ((center_num - half_num) / denom).alias("wilson_lo"),
        ((center_num + half_num) / denom).alias("wilson_hi"),
    ).orderBy("n_name")
q_sla_wilson_ci.__doc__ = q_sla_wilson_ci.__doc__ and q_sla_wilson_ci.__doc__.format(d=SLA_DAYS)


_ORACLE_WILSON = f"""
WITH agg AS (
  SELECT n_name,
         CAST(COUNT(*) AS BIGINT) AS n_items,
         CAST(SUM(CASE WHEN date_diff('day', CAST(o_orderdate AS DATE),
                                      CAST(l_shipdate AS DATE)) <= {SLA_DAYS}
                       THEN 1 ELSE 0 END) AS BIGINT) AS n_ontime
  FROM lineitem
  JOIN orders ON l_orderkey = o_orderkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation ON s_nationkey = n_nationkey
  GROUP BY 1
), d AS (
  SELECT n_name, n_items, n_ontime,
         CAST(n_ontime AS DOUBLE) / CAST(n_items AS DOUBLE) AS phat,
         CAST(n_items AS DOUBLE) AS nd,
         CAST('{_WILSON_Z!r}' AS DOUBLE) AS z
  FROM agg
)
SELECT n_name, n_items, n_ontime, phat AS p_ontime,
       ((phat + z * z / (2.0 * nd))
          - z * SQRT(phat * (1.0 - phat) / nd + z * z / (4.0 * nd * nd)))
         / (1.0 + z * z / nd) AS wilson_lo,
       ((phat + z * z / (2.0 * nd))
          + z * SQRT(phat * (1.0 - phat) / nd + z * z / (4.0 * nd * nd)))
         / (1.0 + z * z / nd) AS wilson_hi
FROM d
ORDER BY n_name
"""


# ---------------------------------------------------------------------------
# Top month-over-month movers (largest absolute revenue swings)
# ---------------------------------------------------------------------------

MOVERS_TOP_K = 15


def q_top_movers_mom(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-{k} month-over-month revenue movers by brand: the (brand,
    month) cells with the largest |Δ| vs the brand's previous observed
    month — the "what changed most" panel on every revenue dashboard
    (directional YoY — ``revenue_yoy_growth`` — says where a nation
    trends; this surfaces the sharpest short-term swings and WHO swung).

    Exactness: monthly revenue is exact integer cents, Δ is integer
    subtraction via a lag window over the brand's observed months, and
    the top-k pick orders by (|Δ| DESC, brand, month) — a total order,
    so the cut line cannot flip across engines. Scale shape: broadcast
    part-dim join onto the fact scan, one hash agg to |brands|×|months|
    cells, lag + TakeOrdered on the domain-sized cell frame.
    """
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    monthly = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy(
            "p_brand",
            (F.year("l_shipdate") * 100 + F.month("l_shipdate")).alias("ym"),
        )
        .agg(
            F.sum(F.round(F.col("l_extendedprice") * 100, 0).cast("bigint"))
            .cast("long")
            .alias("revenue_cents")
        )
    )
    w = Window.partitionBy("p_brand").orderBy("ym")
    delta = F.col("revenue_cents") - F.lag("revenue_cents").over(w)
    moved = monthly.select(
        "p_brand",
        F.col("ym").cast("int").alias("ym"),
        "revenue_cents",
        delta.alias("delta_cents"),
    ).filter(F.col("delta_cents").isNotNull())
    return (
        moved.orderBy(
            F.abs(F.col("delta_cents")).desc(), F.col("p_brand"), F.col("ym")
        )
        .limit(MOVERS_TOP_K)
    )
q_top_movers_mom.__doc__ = q_top_movers_mom.__doc__ and q_top_movers_mom.__doc__.format(k=MOVERS_TOP_K)


_ORACLE_MOVERS = f"""
WITH monthly AS (
  SELECT p_brand,
         YEAR(l_shipdate) * 100 + MONTH(l_shipdate) AS ym,
         CAST(SUM(CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT)) AS BIGINT)
           AS revenue_cents
  FROM lineitem JOIN part ON l_partkey = p_partkey
  GROUP BY 1, 2
), moved AS (
  SELECT p_brand, CAST(ym AS INTEGER) AS ym, revenue_cents,
         revenue_cents - LAG(revenue_cents)
           OVER (PARTITION BY p_brand ORDER BY ym) AS delta_cents
  FROM monthly
)
SELECT p_brand, ym, revenue_cents, delta_cents
FROM moved
WHERE delta_cents IS NOT NULL
ORDER BY ABS(delta_cents) DESC, p_brand, ym
LIMIT {{MOVERS_TOP_K}}
""".format(MOVERS_TOP_K=MOVERS_TOP_K)


# ---------------------------------------------------------------------------
# Open-order backlog timeline (sweep-line running balance)
# ---------------------------------------------------------------------------


def q_orders_backlog_timeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Month-end open-order backlog: how many orders are placed but not
    yet fully shipped at each month boundary — the classic operations
    "work in progress over time" series, computed as a SWEEP LINE: +1 at
    order date, −1 the day after the order's LAST line ships, running-sum
    over the merged event stream, sampled at month ends. (The interval
    twin of ``events_max_concurrency``, but over a derived
    order-lifetime interval — open until the slowest line item leaves.)

    Exactness: ±1 deltas and day indices are integers; the running sum is
    an integer prefix sum; month-end sampling picks the last sweep state
    with day ≤ boundary via a backward-looking window (exactly one row
    per month by construction). Scale shape: per-order close = one hash
    agg on l_orderkey; the sweep collapses to ≤2 rows per DAY before the
    running-sum window (map-side combinable groupBy on day), so the
    window runs over the ~2500-day domain, not the fact rows, at any SF.
    """
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    day = lambda c: F.expr(f"CAST(unix_timestamp({c}) DIV 86400 AS BIGINT)")
    closes = li.groupBy("l_orderkey").agg(
        (F.max(day("l_shipdate")) + F.lit(1)).alias("d")
    )
    opens = orders.select(day("o_orderdate").alias("d"), F.lit(1).alias("delta"))
    closed = orders.join(
        closes, orders.o_orderkey == closes.l_orderkey, "inner"
    ).select("d", F.lit(-1).alias("delta"))
    per_day = (
        opens.unionByName(closed)
        .groupBy("d")
        .agg(F.sum("delta").cast("long").alias("net"))
    )
    w = Window.orderBy("d").rowsBetween(Window.unboundedPreceding, 0)
    swept = per_day.select("d", F.sum("net").over(w).cast("long").alias("open_orders"))
    # month-end sampling: last sweep state at or before each month boundary
    me = swept.select(
        "d",
        "open_orders",
        F.expr(
            "YEAR(to_date(from_unixtime(d * 86400))) * 100"
            " + MONTH(to_date(from_unixtime(d * 86400)))"
        ).alias("ym"),
    )
    w_m = Window.partitionBy("ym").orderBy(F.col("d").desc())
    return (
        me.withColumn("rn", F.row_number().over(w_m))
        .filter(F.col("rn") == 1)
        .select(F.col("ym").cast("int").alias("ym"), "open_orders")
        .orderBy("ym")
    )


_ORACLE_BACKLOG = """
WITH closes AS (
  SELECT l_orderkey,
         MAX(CAST(floor(epoch(CAST(l_shipdate AS TIMESTAMP))) AS BIGINT) // 86400) + 1 AS d
  FROM lineitem GROUP BY 1
), deltas AS (
  SELECT CAST(floor(epoch(CAST(o_orderdate AS TIMESTAMP))) AS BIGINT) // 86400 AS d,
         1 AS delta
  FROM orders
  UNION ALL
  SELECT c.d, -1
  FROM orders JOIN closes c ON o_orderkey = c.l_orderkey
), per_day AS (
  SELECT d, CAST(SUM(delta) AS BIGINT) AS net FROM deltas GROUP BY 1
), swept AS (
  SELECT d,
         CAST(SUM(net) OVER (ORDER BY d
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
           AS open_orders
  FROM per_day
), me AS (
  SELECT d, open_orders,
         YEAR(CAST(to_timestamp(d * 86400) AS DATE)) * 100
           + MONTH(CAST(to_timestamp(d * 86400) AS DATE)) AS ym,
         ROW_NUMBER() OVER (PARTITION BY
             YEAR(CAST(to_timestamp(d * 86400) AS DATE)) * 100
               + MONTH(CAST(to_timestamp(d * 86400) AS DATE))
             ORDER BY d DESC) AS rn
  FROM swept
)
SELECT CAST(ym AS INTEGER) AS ym, open_orders
FROM me WHERE rn = 1
ORDER BY ym
"""


# ---------------------------------------------------------------------------
# Backlog aging snapshot (open-order age buckets at a point in time)
# ---------------------------------------------------------------------------

AGING_SNAP_DAY = 9496  # epoch-day literal = 1996-01-01, mid data range
AGING_BUCKETS = [(0, 30, "0-30d"), (31, 60, "31-60d"), (61, 10**9, "61d+")]


def q_backlog_aging_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aging analysis of the order backlog AS OF 1996-01-01: every order
    open at the snapshot (placed on/before, slowest line not yet shipped
    after) bucketed by days waiting — the standard ops "aging report"
    that turns ``q_orders_backlog_timeline``'s headcount into an urgency
    distribution (61d+ rows are the escalation queue).

    Exactness: open/closed is integer epoch-day comparison against a
    folded literal; ages are integer differences; buckets literal
    ranges; value at risk is exact cents. Scale shape: per-order close
    from one hash agg on l_orderkey, key-local join to orders, one
    conditional filter + 3-group agg — map-side combinable end to end.
    """
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_totalprice"
    )
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    day = lambda c: F.expr(f"CAST(unix_timestamp({c}) DIV 86400 AS BIGINT)")
    closes = li.groupBy("l_orderkey").agg(F.max(day("l_shipdate")).alias("close_d"))
    joined = orders.join(closes, orders.o_orderkey == closes.l_orderkey).select(
        day("o_orderdate").alias("open_d"),
        "close_d",
        F.round(F.col("o_totalprice") * 100, 0).cast("bigint").alias("cents"),
    )
    open_at = joined.filter(
        (F.col("open_d") <= AGING_SNAP_DAY) & (F.col("close_d") > AGING_SNAP_DAY)
    ).select((F.lit(AGING_SNAP_DAY) - F.col("open_d")).alias("age_d"), "cents")
    bucket = F.when(
        (F.col("age_d") >= AGING_BUCKETS[0][0])
        & (F.col("age_d") <= AGING_BUCKETS[0][1]),
        F.lit(AGING_BUCKETS[0][2]),
    )
    for lo, hi, name in AGING_BUCKETS[1:]:
        bucket = bucket.when(
            (F.col("age_d") >= lo) & (F.col("age_d") <= hi), F.lit(name)
        )
    return (
        open_at.select(bucket.alias("age_bucket"), "cents")
        .groupBy("age_bucket")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_orders"),
            F.sum(F.col("cents").cast("decimal(19,0)"))
            .cast("long")
            .alias("value_cents"),
        )
        .orderBy("age_bucket")
    )


def _sql_backlog_aging() -> str:
    case = " ".join(
        f"WHEN age_d BETWEEN {lo} AND {hi} THEN '{name}'"
        for lo, hi, name in AGING_BUCKETS
    )
    return f"""
WITH closes AS (
  SELECT l_orderkey,
         MAX(CAST(floor(epoch(CAST(l_shipdate AS TIMESTAMP))) AS BIGINT) // 86400)
           AS close_d
  FROM lineitem GROUP BY 1
), open_at AS (
  SELECT {AGING_SNAP_DAY}
           - CAST(floor(epoch(CAST(o_orderdate AS TIMESTAMP))) AS BIGINT) // 86400
           AS age_d,
         CAST(ROUND(o_totalprice * 100, 0) AS BIGINT) AS cents
  FROM orders JOIN closes ON o_orderkey = l_orderkey
  WHERE CAST(floor(epoch(CAST(o_orderdate AS TIMESTAMP))) AS BIGINT) // 86400
          <= {AGING_SNAP_DAY}
    AND close_d > {AGING_SNAP_DAY}
)
SELECT CASE {case} END AS age_bucket,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(CAST(cents AS DECIMAL(19,0))) AS BIGINT) AS value_cents
FROM open_at
GROUP BY 1
ORDER BY age_bucket
"""


# ---------------------------------------------------------------------------
# Customer segment migration matrix (tercile transitions year over year)
# ---------------------------------------------------------------------------

MIG_YEAR_FROM, MIG_YEAR_TO = 1995, 1996


def q_customer_migration_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer value-segment migration {y0}→{y1}: every customer's
    revenue TERCILE each year (T1 low / T2 / T3 high, NONE = inactive),
    cross-tabulated — the churn/upgrade/downgrade matrix behind customer-
    success dashboards (the dynamic counterpart of the static
    ``customer_rfm_segments``: RFM says where customers ARE, migration
    says where they are GOING, incl. in/out of the NONE state).

    Exactness: yearly revenue is integer cents; tercile assignment is
    pure integer rank arithmetic seg = ((rn−1)·3) DIV n + 1 over the
    (revenue, custkey) total order — balanced cuts, no float quantiles —
    and the matrix is exact counts. Scale shape: per-year hash agg +
    ONE ``_cum_prev`` bucketed rank over active customers each year (r14
    optimization — no single-task sort), a full outer join on
    custkey against the customer dim (key-local), and a ≤16-group agg.
    """
    cust = load_table(spark, sf_dir, "customer").select("c_custkey")
    orders = load_table(spark, sf_dir, "orders")

    def seg_year(year: int, alias: str) -> DataFrame:
        rev = (
            orders.filter(F.year("o_orderdate") == year)
            .groupBy("o_custkey")
            .agg(
                F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("bigint"))
                .cast("long")
                .alias("rev")
            )
        )
        n_tbl = rev.agg(F.count(F.lit(1)).cast("long").alias("n"))
        ranked = (
            _cum_prev(rev, ["rev", "o_custkey"], {"_rp": F.lit(1)}, materialize=True)
            .crossJoin(F.broadcast(n_tbl))
            .select(
                "o_custkey",
                (F.col("_rp") + F.lit(1)).alias("rn"),
                "n",
            )
        )
        return ranked.select(
            F.col("o_custkey").alias("k"),
            F.concat(F.lit("T"), F.expr("((rn - 1) * 3) DIV n + 1")).alias(alias),
        )

    a = seg_year(MIG_YEAR_FROM, "seg_from")
    b = seg_year(MIG_YEAR_TO, "seg_to")
    joined = (
        cust.join(a, cust.c_custkey == a.k, "left")
        .join(b, cust.c_custkey == b.k, "left")
        .select(
            F.coalesce("seg_from", F.lit("NONE")).alias("seg_from"),
            F.coalesce("seg_to", F.lit("NONE")).alias("seg_to"),
        )
    )
    return (
        joined.groupBy("seg_from", "seg_to")
        .agg(F.count(F.lit(1)).cast("long").alias("n_customers"))
        .orderBy("seg_from", "seg_to")
    )
q_customer_migration_matrix.__doc__ = q_customer_migration_matrix.__doc__ and q_customer_migration_matrix.__doc__.format(y0=MIG_YEAR_FROM, y1=MIG_YEAR_TO)


_ORACLE_MIGRATION = f"""
WITH seg_a AS (
  SELECT o_custkey AS k,
         'T' || CAST(((ROW_NUMBER() OVER (ORDER BY rev, o_custkey) - 1) * 3) // n + 1
                     AS VARCHAR) AS seg_from
  FROM (
    SELECT o_custkey,
           CAST(SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT) AS rev,
           CAST(COUNT(*) OVER () AS BIGINT) AS n
    FROM orders WHERE YEAR(o_orderdate) = {MIG_YEAR_FROM}
    GROUP BY 1
  )
), seg_b AS (
  SELECT o_custkey AS k,
         'T' || CAST(((ROW_NUMBER() OVER (ORDER BY rev, o_custkey) - 1) * 3) // n + 1
                     AS VARCHAR) AS seg_to
  FROM (
    SELECT o_custkey,
           CAST(SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT) AS rev,
           CAST(COUNT(*) OVER () AS BIGINT) AS n
    FROM orders WHERE YEAR(o_orderdate) = {MIG_YEAR_TO}
    GROUP BY 1
  )
)
SELECT COALESCE(seg_from, 'NONE') AS seg_from,
       COALESCE(seg_to, 'NONE') AS seg_to,
       CAST(COUNT(*) AS BIGINT) AS n_customers
FROM customer
LEFT JOIN seg_a ON c_custkey = seg_a.k
LEFT JOIN seg_b ON c_custkey = seg_b.k
GROUP BY 1, 2
ORDER BY seg_from, seg_to
"""


# ---------------------------------------------------------------------------
# Hierarchical share-of-parent rollup (region → nation)
# ---------------------------------------------------------------------------


def q_share_of_parent(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Share-of-parent at every level of the geography hierarchy: each
    nation's share of its region's revenue AND each region's share of
    global revenue, in one result — the % column every drill-down BI
    tree shows next to the value (and the piece plain GROUP BY ROLLUP
    doesn't give you: ROLLUP emits the parent totals, not the ratios).

    Exactness: all revenue is integer cents; each share is ONE division
    of exact integers (window sums over the ≤|nation| aggregate frame).
    Scale shape: one fact-side hash agg to nation grain, then window
    sums over the 25-row frame — parents never rescan the fact table.
    """
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    nat = (
        orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(
            F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("bigint"))
            .cast("long")
            .alias("revenue_cents")
        )
    )
    w_region = Window.partitionBy("r_name")
    w_all = Window.partitionBy()
    region_total = F.sum("revenue_cents").over(w_region).cast("long")
    global_total = F.sum("revenue_cents").over(w_all).cast("long")
    return nat.select(
        "r_name",
        "n_name",
        "revenue_cents",
        (F.col("revenue_cents").cast("double") / region_total.cast("double")).alias(
            "share_of_region"
        ),
        (region_total.cast("double") / global_total.cast("double")).alias(
            "region_share_of_global"
        ),
    ).orderBy("r_name", "n_name")


_ORACLE_SHARE_OF_PARENT = """
WITH nat AS (
  SELECT r_name, n_name,
         CAST(SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT)
           AS revenue_cents
  FROM orders
  JOIN customer ON o_custkey = c_custkey
  JOIN nation ON c_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey
  GROUP BY 1, 2
)
SELECT r_name, n_name, revenue_cents,
       CAST(revenue_cents AS DOUBLE)
         / CAST(CAST(SUM(revenue_cents) OVER (PARTITION BY r_name) AS BIGINT)
                AS DOUBLE) AS share_of_region,
       CAST(CAST(SUM(revenue_cents) OVER (PARTITION BY r_name) AS BIGINT) AS DOUBLE)
         / CAST(CAST(SUM(revenue_cents) OVER () AS BIGINT) AS DOUBLE)
         AS region_share_of_global
FROM nat
ORDER BY r_name, n_name
"""


# ---------------------------------------------------------------------------
# Single-source supply risk (sole-supplier parts per brand)
# ---------------------------------------------------------------------------


def q_single_source_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Supply-chain concentration risk: parts observed from EXACTLY ONE
    supplier, rolled up per brand with the at-risk revenue share — the
    procurement audit behind every "dual-source the A-items" program
    (``market_concentration_hhi`` measures concentration among suppliers;
    this flags where substitution is impossible at any price).

    Exactness: supplier counts are exact distincts, revenue is integer
    cents, shares are one division each. Scale shape: (part → distinct
    suppliers) and (part → revenue cents) are two map-side-combinable
    hash aggs on l_partkey; the brand rollup joins them to the broadcast
    part dim — nothing fact-sized shuffles twice.
    """
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    per_part = li.groupBy("l_partkey").agg(
        F.countDistinct("l_suppkey").cast("long").alias("n_suppliers"),
        F.sum(F.round(F.col("l_extendedprice") * 100, 0).cast("bigint"))
        .cast("long")
        .alias("revenue_cents"),
    )
    branded = per_part.join(F.broadcast(part), per_part.l_partkey == part.p_partkey)
    agg = branded.groupBy("p_brand").agg(
        F.count(F.lit(1)).cast("long").alias("n_parts"),
        F.sum((F.col("n_suppliers") == 1).cast("long"))
        .cast("long")
        .alias("n_single_source"),
        F.sum("revenue_cents").cast("long").alias("revenue_cents"),
        F.sum(F.when(F.col("n_suppliers") == 1, F.col("revenue_cents")).otherwise(0))
        .cast("long")
        .alias("at_risk_cents"),
    )
    return agg.select(
        "p_brand",
        "n_parts",
        "n_single_source",
        (
            F.col("n_single_source").cast("double") / F.col("n_parts").cast("double")
        ).alias("single_source_share"),
        "at_risk_cents",
        (
            F.col("at_risk_cents").cast("double") / F.col("revenue_cents").cast("double")
        ).alias("at_risk_revenue_share"),
    ).orderBy("p_brand")


_ORACLE_SINGLE_SOURCE = """
WITH per_part AS (
  SELECT l_partkey,
         CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS n_suppliers,
         CAST(SUM(CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT)) AS BIGINT)
           AS revenue_cents
  FROM lineitem GROUP BY 1
), agg AS (
  SELECT p_brand,
         CAST(COUNT(*) AS BIGINT) AS n_parts,
         CAST(SUM(CASE WHEN n_suppliers = 1 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_single_source,
         CAST(SUM(revenue_cents) AS BIGINT) AS revenue_cents,
         CAST(SUM(CASE WHEN n_suppliers = 1 THEN revenue_cents ELSE 0 END) AS BIGINT)
           AS at_risk_cents
  FROM per_part JOIN part ON l_partkey = p_partkey
  GROUP BY 1
)
SELECT p_brand, n_parts, n_single_source,
       CAST(n_single_source AS DOUBLE) / CAST(n_parts AS DOUBLE)
         AS single_source_share,
       at_risk_cents,
       CAST(at_risk_cents AS DOUBLE) / CAST(revenue_cents AS DOUBLE)
         AS at_risk_revenue_share
FROM agg
ORDER BY p_brand
"""


# ---------------------------------------------------------------------------
# XYZ demand-variability classification (integer-exact CV classes)
# ---------------------------------------------------------------------------


def q_xyz_demand_class(spark: SparkSession, sf_dir: str) -> DataFrame:
    """XYZ analysis — the demand-variability axis that pairs with ABC's
    value axis (``abc_pareto_class``): per part, the coefficient of
    variation of MONTHLY demand over the dense month spine (zero months
    are real demand signal), classed X (CV<0.5, steady — forecastable),
    Y (CV<1), Z (CV≥1, erratic — safety-stock territory), NO_DEMAND;
    rolled up per brand. Inventory planners read the ABC×XYZ grid.

    The classification is INTEGER-EXACT — no CV is ever computed as a
    float: CV² = n·Σq²/(Σq)² − 1, so CV < c is the cross-multiplied
    integer comparison (e.g. X ⇔ 4·n·Σq² < 5·(Σq)²) on exact DECIMAL
    products. Nothing to round, nothing engine-ordered.

    Scale shape: one (part, month) hash agg, one moment agg per part,
    broadcast brand rollup. The dense month spine is NEVER materialized:
    zero months contribute nothing to Σq or Σq², so the only thing the
    |parts|·|months| zero-fill ever added was n = |months| — a broadcast
    1-row scalar — and parts absent from lineitem (NO_DEMAND) come from
    a left join off the part table. (The r8 spine-join shape hit a plan
    cliff at organic sf1: Catalyst under-estimated the data-sized
    monthly agg and BROADCAST it — 21 s at sf1 vs 11 s at sf2 where the
    estimate crossed the threshold and SMJ kicked in. The oracle keeps
    the literal spine formulation, so the gate proves the rewrite
    value-identical rather than assuming the algebra.)
    """
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    qty = F.round(F.col("l_quantity"), 0).cast("bigint")
    monthly = li.groupBy(
        F.col("l_partkey").alias("pk"),
        (F.year("l_shipdate") * 12 + F.month("l_shipdate")).alias("ym"),
    ).agg(F.sum(qty).cast("long").alias("q"))
    n_months = li.select(
        (F.year("l_shipdate") * 12 + F.month("l_shipdate")).alias("ym")
    ).agg(F.countDistinct("ym").cast("long").alias("n"))
    msum = monthly.groupBy("pk").agg(
        F.sum(F.col("q").cast("decimal(18,0)")).alias("sq_p"),
        F.sum(
            F.col("q").cast("decimal(18,0)") * F.col("q").cast("decimal(18,0)")
        ).alias("sq2_p"),
    )
    dec = lambda c, w: F.col(c).cast(f"decimal({w},0)")
    m = (
        part.select(F.col("p_partkey").alias("pk"))
        .join(msum, "pk", "left")
        .crossJoin(F.broadcast(n_months))
        .select(
            "pk",
            "n",
            F.coalesce("sq_p", F.lit(0).cast("decimal(18,0)")).alias("sq"),
            F.coalesce("sq2_p", F.lit(0).cast("decimal(18,0)")).alias("sq2"),
        )
    )
    lhs = dec("n", 6) * F.col("sq2")  # n·Σq²  (DECIMAL exact)
    rhs = F.col("sq") * F.col("sq")  # (Σq)²
    cls = (
        F.when(F.col("sq") == 0, F.lit("NO_DEMAND"))
        .when(lhs * 4 < rhs * 5, F.lit("X"))
        .when(lhs < rhs * 2, F.lit("Y"))
        .otherwise(F.lit("Z"))
    )
    return (
        m.select("pk", cls.alias("xyz_class"))
        .join(F.broadcast(part), F.col("pk") == part.p_partkey)
        .groupBy("p_brand", "xyz_class")
        .agg(F.count(F.lit(1)).cast("long").alias("n_parts"))
        .orderBy("p_brand", "xyz_class")
    )


_ORACLE_XYZ = """
WITH monthly AS (
  SELECT l_partkey AS pk,
         YEAR(l_shipdate) * 12 + MONTH(l_shipdate) AS ym,
         CAST(SUM(CAST(ROUND(l_quantity, 0) AS BIGINT)) AS BIGINT) AS q
  FROM lineitem GROUP BY 1, 2
), months AS (
  SELECT DISTINCT YEAR(l_shipdate) * 12 + MONTH(l_shipdate) AS ym FROM lineitem
), dense AS (
  SELECT p.p_partkey AS pk, COALESCE(m.q, 0) AS q
  FROM part p CROSS JOIN months mo
  LEFT JOIN monthly m ON p.p_partkey = m.pk AND mo.ym = m.ym
), mom AS (
  SELECT pk,
         CAST(COUNT(*) AS BIGINT) AS n,
         SUM(CAST(q AS DECIMAL(18,0))) AS sq,
         SUM(CAST(q AS DECIMAL(18,0)) * CAST(q AS DECIMAL(18,0))) AS sq2
  FROM dense GROUP BY 1
), classed AS (
  SELECT pk,
         CASE WHEN sq = 0 THEN 'NO_DEMAND'
              WHEN CAST(n AS DECIMAL(6,0)) * sq2 * 4 < sq * sq * 5 THEN 'X'
              WHEN CAST(n AS DECIMAL(6,0)) * sq2 < sq * sq * 2 THEN 'Y'
              ELSE 'Z' END AS xyz_class
  FROM mom
)
SELECT p_brand, xyz_class, CAST(COUNT(*) AS BIGINT) AS n_parts
FROM classed JOIN part ON pk = p_partkey
GROUP BY 1, 2
ORDER BY p_brand, xyz_class
"""


# ---------------------------------------------------------------------------
# New vs returning revenue split (growth accounting)
# ---------------------------------------------------------------------------


def q_new_vs_returning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Monthly revenue split into NEW (customer's first-ever order lands
    in this month) vs RETURNING — growth accounting's first cut: the
    same top-line month can be healthy acquisition or pure base milking,
    and this split is how you tell (the revenue-side complement of
    ``events_cohort_retention``'s user-count view).

    Exactness: first-order attribution is a per-customer MIN over order
    (date, key) — a total order, deterministic under ties — revenue is
    integer cents, shares one division. Scale shape: one per-customer
    min hash agg joined back key-local, then a month rollup; the window
    total runs on the ≤|months| frame.
    """
    orders = load_table(spark, sf_dir, "orders")
    first = orders.groupBy("o_custkey").agg(
        F.min(F.struct("o_orderdate", "o_orderkey")).alias("f")
    ).select("o_custkey", F.col("f.o_orderkey").alias("first_key"))
    ym = (F.year("o_orderdate") * 100 + F.month("o_orderdate")).cast("int")
    cents = F.round(F.col("o_totalprice") * 100, 0).cast("bigint")
    tagged = orders.join(first, "o_custkey").select(
        ym.alias("ym"),
        F.when(F.col("o_orderkey") == F.col("first_key"), F.lit("new"))
        .otherwise(F.lit("returning"))
        .alias("segment"),
        cents.alias("cents"),
    )
    agg = tagged.groupBy("ym", "segment").agg(
        F.count(F.lit(1)).cast("long").alias("n_orders"),
        F.sum(F.col("cents").cast("decimal(19,0)")).cast("long").alias("revenue_cents"),
    )
    month_total = F.sum("revenue_cents").over(Window.partitionBy("ym")).cast("long")
    return agg.select(
        "ym",
        "segment",
        "n_orders",
        "revenue_cents",
        (F.col("revenue_cents").cast("double") / month_total.cast("double")).alias(
            "share_of_month"
        ),
    ).orderBy("ym", "segment")


_ORACLE_NEW_VS_RETURNING = """
WITH first_o AS (
  SELECT o_custkey,
         MIN(ROW(o_orderdate, o_orderkey)) AS f
  FROM orders GROUP BY 1
), tagged AS (
  SELECT CAST(YEAR(o_orderdate) * 100 + MONTH(o_orderdate) AS INTEGER) AS ym,
         CASE WHEN o_orderkey = f.f[2] THEN 'new' ELSE 'returning' END AS segment,
         CAST(ROUND(o_totalprice * 100, 0) AS BIGINT) AS cents
  FROM orders JOIN first_o f USING (o_custkey)
), agg AS (
  SELECT ym, segment,
         CAST(COUNT(*) AS BIGINT) AS n_orders,
         CAST(SUM(CAST(cents AS DECIMAL(19,0))) AS BIGINT) AS revenue_cents
  FROM tagged GROUP BY 1, 2
)
SELECT ym, segment, n_orders, revenue_cents,
       CAST(revenue_cents AS DOUBLE)
         / CAST(CAST(SUM(revenue_cents) OVER (PARTITION BY ym) AS BIGINT) AS DOUBLE)
         AS share_of_month
FROM agg
ORDER BY ym, segment
"""


# ---------------------------------------------------------------------------
# Reorder-interval distribution (repeat-purchase cadence)
# ---------------------------------------------------------------------------


def q_reorder_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repeat-purchase cadence: the distribution of day gaps between a
    customer's consecutive orders, summarized as exact p25/p50/p75 —
    THE replenishment number behind reorder reminders, churn clocks
    ("3× the median gap with no order = at risk"), and inventory cycles
    (the order-side twin of ``events_time_to_convert``'s event-side
    latency percentiles).

    Exactness: gaps are integer epoch-day differences over the
    per-customer (date, key) total order; the quartiles are RANK PICKS
    at ceil(q·n) with DIV arithmetic — real data values. Scale shape:
    one customer-keyed sort window for the lag, one global rank window
    over the gap multiset (the ``global_rank_bucketed`` escape applies
    at real scale); output is ONE row.
    """
    orders = load_table(spark, sf_dir, "orders")
    day = F.expr("CAST(unix_timestamp(o_orderdate) DIV 86400 AS BIGINT)")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    gaps = (
        orders.select("o_custkey", "o_orderdate", "o_orderkey", day.alias("d"))
        .select(
            "o_custkey",
            "o_orderkey",
            (F.col("d") - F.lag("d").over(w)).alias("gap_d"),
        )
        .filter(F.col("gap_d").isNotNull())
    )
    n_tbl = gaps.agg(F.count(F.lit(1)).cast("long").alias("n"))
    ranked = (
        _cum_prev(
            gaps,
            ["gap_d", "o_custkey", "o_orderkey"],
            {"_rp": F.lit(1)},
            materialize=True,
        )
        .crossJoin(F.broadcast(n_tbl))
        .select(
            "gap_d",
            (F.col("_rp") + F.lit(1)).alias("rn"),
            "n",
        )
    )
    return ranked.agg(
        F.max("n").alias("n_gaps"),
        F.max(F.when(F.col("rn") == F.expr("(n + 3) DIV 4"), F.col("gap_d"))).alias(
            "p25_days"
        ),
        F.max(F.when(F.col("rn") == F.expr("(n + 1) DIV 2"), F.col("gap_d"))).alias(
            "p50_days"
        ),
        F.max(
            F.when(F.col("rn") == F.expr("(3 * n + 3) DIV 4"), F.col("gap_d"))
        ).alias("p75_days"),
    )


_ORACLE_REORDER = """
WITH gaps AS (
  SELECT o_custkey, o_orderkey,
         CAST(floor(epoch(CAST(o_orderdate AS TIMESTAMP))) AS BIGINT) // 86400
           - LAG(CAST(floor(epoch(CAST(o_orderdate AS TIMESTAMP))) AS BIGINT) // 86400)
             OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS gap_d
  FROM orders
), ranked AS (
  SELECT gap_d,
         ROW_NUMBER() OVER (ORDER BY gap_d, o_custkey, o_orderkey) AS rn,
         CAST(COUNT(*) OVER () AS BIGINT) AS n
  FROM gaps WHERE gap_d IS NOT NULL
)
SELECT MAX(n) AS n_gaps,
       MAX(CASE WHEN rn = (n + 3) // 4 THEN gap_d END) AS p25_days,
       MAX(CASE WHEN rn = (n + 1) // 2 THEN gap_d END) AS p50_days,
       MAX(CASE WHEN rn = (3 * n + 3) // 4 THEN gap_d END) AS p75_days
FROM ranked
"""


# ---------------------------------------------------------------------------
# 4-4-5 fiscal calendar rollup (retail/NRF-style periods)
# ---------------------------------------------------------------------------

FISCAL_EPOCH_DAY = 8768   # 1994-01-03, a Monday before the data range
FISCAL_YEAR_BASE = 1994
# cumulative week cut of each 4-4-5 period within the 52-week year
_F445_CUTS = [4, 8, 13, 17, 21, 26, 30, 34, 39, 43, 47, 52]


def q_fiscal_445_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue by 4-4-5 FISCAL period — the retail/NRF calendar where
    every period is a whole number of weeks (4-4-5 per quarter), so
    period-over-period comparisons hold weekday mix constant (a calendar
    month mixes 4 and 5 weekends; this is why retailers don't report on
    months). Weeks count from a fixed Monday epoch; 52-week fiscal years
    (the real calendar's occasional 53rd week is a restatement policy,
    not arithmetic — documented out of scope).

    Engine-neutral by construction: fiscal week/year/period are pure
    integer day arithmetic against folded literals ((day−epoch) DIV 7,
    DIV 52, cumulative-cut CASE) — no engine week/DOW function is
    trusted anywhere (the holiday-lift lesson). Revenue exact cents.
    Scale shape: the mapping is a per-row expression inside the scan;
    ONE hash agg to ≤|years|·12 cells.
    """
    orders = load_table(spark, sf_dir, "orders")
    day = F.expr("CAST(unix_timestamp(o_orderdate) DIV 86400 AS BIGINT)")
    fw = ((day - F.lit(FISCAL_EPOCH_DAY)) / F.lit(7)).cast("bigint")
    fy = (F.lit(FISCAL_YEAR_BASE) + (F.col("fw") / F.lit(52)).cast("bigint")).cast(
        "int"
    )
    woy = (F.col("fw") % 52).cast("int")
    period = F.when(F.col("woy") < _F445_CUTS[0], 1)
    for i, cut in enumerate(_F445_CUTS[1:], start=2):
        period = period.when(F.col("woy") < cut, i)
    cents = F.round(F.col("o_totalprice") * 100, 0).cast("bigint")
    base = orders.select(fw.alias("fw"), cents.alias("cents")).select(
        "cents", "fw", fy.alias("fiscal_year"), woy.alias("woy")
    )
    return (
        base.select("cents", "fiscal_year", period.alias("fiscal_period"))
        .groupBy("fiscal_year", "fiscal_period")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_orders"),
            F.sum(F.col("cents").cast("decimal(19,0)"))
            .cast("long")
            .alias("revenue_cents"),
        )
        .orderBy("fiscal_year", "fiscal_period")
    )


def _sql_fiscal_445() -> str:
    case = " ".join(
        f"WHEN woy < {cut} THEN {i}" for i, cut in enumerate(_F445_CUTS, start=1)
    )
    return f"""
WITH base AS (
  SELECT CAST(ROUND(o_totalprice * 100, 0) AS BIGINT) AS cents,
         (CAST(floor(epoch(CAST(o_orderdate AS TIMESTAMP))) AS BIGINT) // 86400
            - {FISCAL_EPOCH_DAY}) // 7 AS fw
  FROM orders
), mapped AS (
  SELECT cents,
         CAST({FISCAL_YEAR_BASE} + fw // 52 AS INTEGER) AS fiscal_year,
         CAST(fw % 52 AS INTEGER) AS woy
  FROM base
)
SELECT fiscal_year,
       CASE {case} END AS fiscal_period,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(CAST(cents AS DECIMAL(19,0))) AS BIGINT) AS revenue_cents
FROM mapped
GROUP BY 1, 2
ORDER BY fiscal_year, fiscal_period
"""



# ---------------------------------------------------------------------------
# Pareto skyline (round 8)
# ---------------------------------------------------------------------------


def q_pareto_skyline_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pareto-optimal suppliers on (cost, speed): the SKYLINE operator —
    keep every supplier no other supplier dominates (cheaper-or-equal AND
    faster-or-equal, strictly better somewhere). The classic multi-
    criteria shortlist (Börzsönyi et al. 2001, the operator relational
    engines never shipped); cost = average effective line price, speed =
    average ship lag in days, both exact rationals from integer/cent
    sums. ``breadth.q_skyline_pareto`` solves the INTEGER-bucketed case
    (p_size has ≤50 values → per-size min + threshold table); this entry
    is the CONTINUOUS-domain general form, where no bucketing exists and
    the sorted-scan with a running lexicographic min is the right plan.

    Scale shape: the naive skyline is an O(n²) self-join; in 2-D it
    collapses to ONE SORTED SCAN — order by (cost asc, lag asc) and keep
    rows whose lag is strictly below the running minimum of all
    PRECEDING lags (equal-cost ties resolved by the secondary sort: the
    first row of a cost group survives, later rows only with strictly
    smaller lag). The window runs over the SUPPLIER aggregate (|S|
    rows), not the fact table — the only data-sized work is the metric
    aggregation. The oracle is the textbook NOT-EXISTS dominance test,
    so the sorted-scan rewrite is verified against the definition, not
    against itself."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_suppkey", "l_orderkey", "l_extendedprice", "l_quantity", "l_shipdate"
    )
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    j = li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
    per_supp = j.groupBy("l_suppkey").agg(
        F.count(F.lit(1)).alias("n_lines"),
        F.sum(F.round(F.col("l_extendedprice") * 100).cast("decimal(38,0)"))
        .cast("double")
        .alias("price_cents"),
        F.sum(F.col("l_quantity").cast("decimal(38,0)")).cast("double").alias("qty"),
        F.sum(F.datediff("l_shipdate", "o_orderdate").cast("decimal(38,0)"))
        .cast("double")
        .alias("lag_days"),
    )
    metrics = per_supp.select(
        "l_suppkey",
        "n_lines",
        (F.col("price_cents") / F.col("qty") / F.lit(100.0)).alias("avg_unit_price"),
        (F.col("lag_days") / F.col("n_lines").cast("double")).alias("avg_ship_lag"),
    )
    # running LEXICOGRAPHIC min of (lag, price) over all preceding rows:
    # survive iff (lag, price) <= that pair — strictly-smaller prior lag
    # kills the row, an equal-lag prior row kills it only when strictly
    # cheaper, and an exact-duplicate point correctly CO-SURVIVES (the
    # textbook skyline keeps incomparable ties; a plain min(lag) scan
    # would wrongly drop twins).
    # bucketed running MIN (r14 optimization): min is commutative/
    # associative, so the exclusive-prefix min decomposes exactly like
    # the _cum_prev sums — per-bucket struct mins, an exclusive prefix
    # over the <=1024-row bucket table, F.least with the within-bucket
    # exclusive min (least skips NULLs; both NULL -> NULL, matching the
    # empty-prefix semantics of the plain window).
    metrics = metrics.localCheckpoint(eager=False)
    st = metrics.agg(
        F.min("avg_unit_price").alias("_mn"), F.max("avg_unit_price").alias("_mx")
    )
    pb = F.coalesce(
        F.least(
            F.lit(_CUM_BUCKETS - 1),
            F.floor(
                (F.col("avg_unit_price") - F.col("_mn"))
                * _CUM_BUCKETS
                / F.nullif(
                    (F.col("_mx") - F.col("_mn")).cast("double"), F.lit(0.0)
                )
            ),
        ).cast("int"),
        F.lit(0),
    )
    bl = metrics.crossJoin(F.broadcast(st)).withColumn("_b", pb).drop("_mn", "_mx")
    w_boff = Window.orderBy("_b").rowsBetween(Window.unboundedPreceding, -1)
    offs = (
        bl.groupBy("_b")
        .agg(F.min(F.struct("avg_ship_lag", "avg_unit_price")).alias("_bm"))
        .select("_b", F.min("_bm").over(w_boff).alias("_offmin"))
    )
    w_in = Window.partitionBy("_b").orderBy(
        F.asc("avg_unit_price"), F.asc("avg_ship_lag")
    ).rowsBetween(Window.unboundedPreceding, -1)
    run_min = F.least(
        F.col("_offmin"),
        F.min(F.struct("avg_ship_lag", "avg_unit_price")).over(w_in),
    )
    cur = F.struct("avg_ship_lag", "avg_unit_price")
    return (
        bl.join(F.broadcast(offs), "_b")
        .withColumn("_prev_min", run_min)
        .filter(F.col("_prev_min").isNull() | (cur <= F.col("_prev_min")))
        .select("l_suppkey", "n_lines", "avg_unit_price", "avg_ship_lag")
        .orderBy("avg_unit_price", "l_suppkey")
    )


_ORACLE_PARETO_SKYLINE = """
WITH per_supp AS (
  SELECT l_suppkey,
         COUNT(*) AS n_lines,
         CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS DECIMAL(38,0))) AS DOUBLE)
           AS price_cents,
         CAST(SUM(CAST(l_quantity AS DECIMAL(38,0))) AS DOUBLE) AS qty,
         CAST(SUM(CAST((CAST(l_shipdate AS DATE) - CAST(o_orderdate AS DATE))
                       AS DECIMAL(38,0))) AS DOUBLE) AS lag_days
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  GROUP BY 1
), metrics AS (
  SELECT l_suppkey, n_lines,
         price_cents / qty / 100.0 AS avg_unit_price,
         lag_days / CAST(n_lines AS DOUBLE) AS avg_ship_lag
  FROM per_supp
)
SELECT m.l_suppkey, m.n_lines, m.avg_unit_price, m.avg_ship_lag
FROM metrics m
WHERE NOT EXISTS (
  SELECT 1 FROM metrics d
  WHERE d.avg_unit_price <= m.avg_unit_price
    AND d.avg_ship_lag <= m.avg_ship_lag
    AND (d.avg_unit_price < m.avg_unit_price OR d.avg_ship_lag < m.avg_ship_lag)
)
ORDER BY avg_unit_price, l_suppkey
"""


# ---------------------------------------------------------------------------
# ABC x XYZ planner grid (value axis x variability axis, per part)
# ---------------------------------------------------------------------------


def q_abc_xyz_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The inventory planner's ABC x XYZ matrix: every part classified on
    BOTH axes — revenue importance (A/B/C, the exact-decimal running-share
    cut of ``abc_pareto_class``) and demand variability (X/Y/Z/NO_DEMAND,
    the integer-exact CV classes of ``xyz_demand_class``) — and the grid
    cell counts with revenue share per cell. AX cells are forecast-and-
    automate; CZ cells are review-manually; this join of the two single-
    axis views is the actual planning artifact both docstrings reference.

    Exactness is inherited: the ABC cut is DECIMAL cross-multiplication
    (association-free running sum over the part domain), the XYZ cut is
    integer cross-multiplication, and the only floats are the final
    revenue-share divisions. Scale shape: two part-domain aggregates and
    one part-keyed join — the grid itself is <= 12 rows."""
    li = load_table(spark, sf_dir, "lineitem")
    # --- value axis (abc_pareto_class decomposition) ---
    per_part = li.groupBy("l_partkey").agg(
        dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), scale=4)
        .cast("decimal(38,4)")
        .alias("rev")
    )
    total = per_part.agg(F.sum("rev").alias("total_rev"))
    abc = (
        _cum_prev(
            per_part.withColumn("_negrev", -F.col("rev")),
            ["_negrev", "l_partkey"],
            {"_cp": F.col("rev")},
            materialize=True,
        )
        .withColumn("cum", F.col("_cp") + F.col("rev"))
        .crossJoin(F.broadcast(total))
        .select(
            F.col("l_partkey").alias("pk_a"),
            "rev",
            "total_rev",
            F.when(F.col("cum") * 100 <= F.col("total_rev") * ABC_A_PCT, "A")
            .when(F.col("cum") * 100 <= F.col("total_rev") * ABC_B_PCT, "B")
            .otherwise("C")
            .alias("abc_class"),
        )
    )
    # --- variability axis (xyz_demand_class decomposition) ---
    part = load_table(spark, sf_dir, "part").select("p_partkey")
    qty = F.round(F.col("l_quantity"), 0).cast("bigint")
    monthly = li.groupBy(
        F.col("l_partkey").alias("pk"),
        (F.year("l_shipdate") * 12 + F.month("l_shipdate")).alias("ym"),
    ).agg(F.sum(qty).cast("long").alias("q"))
    n_months = li.select(
        (F.year("l_shipdate") * 12 + F.month("l_shipdate")).alias("ym")
    ).agg(F.countDistinct("ym").cast("long").alias("n"))
    msum = monthly.groupBy("pk").agg(
        F.sum(F.col("q").cast("decimal(18,0)")).alias("sq_p"),
        F.sum(
            F.col("q").cast("decimal(18,0)") * F.col("q").cast("decimal(18,0)")
        ).alias("sq2_p"),
    )
    m = (
        part.select(F.col("p_partkey").alias("pk"))
        .join(msum, "pk", "left")
        .crossJoin(F.broadcast(n_months))
        .select(
            "pk",
            "n",
            F.coalesce("sq_p", F.lit(0).cast("decimal(18,0)")).alias("sq"),
            F.coalesce("sq2_p", F.lit(0).cast("decimal(18,0)")).alias("sq2"),
        )
    )
    lhs = F.col("n").cast("decimal(6,0)") * F.col("sq2")
    rhs = F.col("sq") * F.col("sq")
    xyz = m.select(
        "pk",
        F.when(F.col("sq") == 0, F.lit("NO_DEMAND"))
        .when(lhs * 4 < rhs * 5, F.lit("X"))
        .when(lhs < rhs * 2, F.lit("Y"))
        .otherwise(F.lit("Z"))
        .alias("xyz_class"),
    )
    grid = abc.join(xyz, abc["pk_a"] == xyz["pk"]).groupBy(
        "abc_class", "xyz_class"
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n_parts"),
        F.sum("rev").cast("double").alias("cell_revenue"),
        (
            F.sum("rev").cast("double") / F.first("total_rev").cast("double")
        ).alias("revenue_share"),
    )
    return grid.orderBy("abc_class", "xyz_class")


_ORACLE_ABC_XYZ_GRID = f"""
WITH per_part AS (
  SELECT l_partkey,
         CAST({sql_dsum("l_extendedprice * (1 - l_discount)", scale=4)} AS DECIMAL(38,4)) AS rev
  FROM lineitem GROUP BY l_partkey
), abc AS (
  SELECT l_partkey AS pk_a, rev,
         (SELECT SUM(rev) FROM per_part) AS total_rev,
         CASE WHEN SUM(rev) OVER (ORDER BY rev DESC, l_partkey ASC
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) * 100
                 <= (SELECT SUM(rev) FROM per_part) * {ABC_A_PCT} THEN 'A'
              WHEN SUM(rev) OVER (ORDER BY rev DESC, l_partkey ASC
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) * 100
                 <= (SELECT SUM(rev) FROM per_part) * {ABC_B_PCT} THEN 'B'
              ELSE 'C' END AS abc_class
  FROM per_part
), monthly AS (
  SELECT l_partkey AS pk,
         YEAR(l_shipdate) * 12 + MONTH(l_shipdate) AS ym,
         CAST(SUM(CAST(ROUND(l_quantity, 0) AS BIGINT)) AS BIGINT) AS q
  FROM lineitem GROUP BY 1, 2
), nm AS (
  SELECT CAST(COUNT(DISTINCT YEAR(l_shipdate) * 12 + MONTH(l_shipdate)) AS BIGINT) AS n
  FROM lineitem
), msum AS (
  SELECT pk,
         SUM(CAST(q AS DECIMAL(18,0))) AS sq_p,
         SUM(CAST(q AS DECIMAL(18,0)) * CAST(q AS DECIMAL(18,0))) AS sq2_p
  FROM monthly GROUP BY 1
), xyz AS (
  SELECT p_partkey AS pk,
         CASE WHEN COALESCE(sq_p, 0) = 0 THEN 'NO_DEMAND'
              WHEN CAST(n AS DECIMAL(6,0)) * COALESCE(sq2_p, 0) * 4
                   < COALESCE(sq_p, 0) * COALESCE(sq_p, 0) * 5 THEN 'X'
              WHEN CAST(n AS DECIMAL(6,0)) * COALESCE(sq2_p, 0)
                   < COALESCE(sq_p, 0) * COALESCE(sq_p, 0) * 2 THEN 'Y'
              ELSE 'Z' END AS xyz_class
  FROM part LEFT JOIN msum ON p_partkey = msum.pk CROSS JOIN nm
)
SELECT abc_class, xyz_class,
       CAST(COUNT(*) AS BIGINT) AS n_parts,
       CAST(SUM(rev) AS DOUBLE) AS cell_revenue,
       CAST(SUM(rev) AS DOUBLE) / CAST(ANY_VALUE(total_rev) AS DOUBLE) AS revenue_share
FROM abc JOIN xyz ON abc.pk_a = xyz.pk
GROUP BY 1, 2
ORDER BY abc_class, xyz_class
"""


# ---------------------------------------------------------------------------
# OTIF (on-time in-full) order fulfillment rate
# ---------------------------------------------------------------------------

OTIF_DAYS = 30  # on-time = every line shipped within this many days of order


def q_otif_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OTIF rate per order month: an order counts as fulfilled on-time
    in-full when its LAST line ships within {d} days of the order date
    (on-time) and NO line was returned (in-full: l_returnflag <> 'R') —
    the standard supply-chain service-level KPI, reported as monthly
    rates with the two failure modes split out so planners see whether
    lateness or returns drives the miss. All counts are exact integers
    from one order-level agg; the rates are single divisions.

    Scale shape: one lineitem->order join (fact-fact, but the lineitem
    side pre-aggregates to per-order max-ship/any-return first, so the
    join is order-domain vs order-domain on the key), one monthly agg."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_shipdate", "l_returnflag"
    )
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    per_order = li.groupBy("l_orderkey").agg(
        F.max(F.to_date("l_shipdate")).alias("last_ship"),
        F.max(F.when(F.col("l_returnflag") == "R", 1).otherwise(0)).alias(
            "any_return"
        ),
    )
    joined = per_order.join(
        orders, per_order["l_orderkey"] == orders["o_orderkey"]
    ).select(
        (F.year("o_orderdate") * 12 + F.month("o_orderdate")).alias("ym"),
        (
            F.datediff(F.col("last_ship"), F.to_date("o_orderdate"))
            <= F.lit(OTIF_DAYS)
        ).alias("on_time"),
        (F.col("any_return") == 0).alias("in_full"),
    )
    agg = joined.groupBy("ym").agg(
        F.count(F.lit(1)).cast("long").alias("n_orders"),
        F.sum(F.when(F.col("on_time") & F.col("in_full"), 1).otherwise(0))
        .cast("long")
        .alias("n_otif"),
        F.sum(F.when(~F.col("on_time"), 1).otherwise(0)).cast("long").alias("n_late"),
        F.sum(F.when(~F.col("in_full"), 1).otherwise(0))
        .cast("long")
        .alias("n_returned"),
    )
    nd = F.col("n_orders").cast("double")
    return agg.select(
        "ym",
        "n_orders",
        "n_otif",
        "n_late",
        "n_returned",
        (F.col("n_otif").cast("double") / nd).alias("otif_rate"),
        (F.col("n_late").cast("double") / nd).alias("late_rate"),
        (F.col("n_returned").cast("double") / nd).alias("return_rate"),
    ).orderBy("ym")


_ORACLE_OTIF = f"""
WITH per_order AS (
  SELECT l_orderkey,
         MAX(CAST(l_shipdate AS DATE)) AS last_ship,
         MAX(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS any_return
  FROM lineitem GROUP BY 1
), joined AS (
  SELECT YEAR(o_orderdate) * 12 + MONTH(o_orderdate) AS ym,
         (last_ship - CAST(o_orderdate AS DATE)) <= {OTIF_DAYS} AS on_time,
         any_return = 0 AS in_full
  FROM per_order JOIN orders ON l_orderkey = o_orderkey
), agg AS (
  SELECT ym,
         CAST(COUNT(*) AS BIGINT) AS n_orders,
         CAST(SUM(CASE WHEN on_time AND in_full THEN 1 ELSE 0 END) AS BIGINT) AS n_otif,
         CAST(SUM(CASE WHEN NOT on_time THEN 1 ELSE 0 END) AS BIGINT) AS n_late,
         CAST(SUM(CASE WHEN NOT in_full THEN 1 ELSE 0 END) AS BIGINT) AS n_returned
  FROM joined GROUP BY 1
)
SELECT ym, n_orders, n_otif, n_late, n_returned,
       CAST(n_otif AS DOUBLE) / CAST(n_orders AS DOUBLE) AS otif_rate,
       CAST(n_late AS DOUBLE) / CAST(n_orders AS DOUBLE) AS late_rate,
       CAST(n_returned AS DOUBLE) / CAST(n_orders AS DOUBLE) AS return_rate
FROM agg
ORDER BY ym
"""


# ---------------------------------------------------------------------------
# Round-10 additions: newsvendor stocking and arc price elasticity
# ---------------------------------------------------------------------------

NV_CU = 9  # newsvendor underage cost -> critical ratio cu/(cu+co) = 0.9
NV_CO = 1


def q_newsvendor_quantile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Newsvendor optimal stock level per brand: the critical-fractile
    solution S* = F⁻¹(cu/(cu+co)) with cu={cu}, co={co} (ratio 0.9) over
    the empirical daily-demand distribution — the inventory-theory
    counterpart of ``fulfillment_percentiles`` (that entry reads service
    latency; this one sets the stock that balances lost sales against
    holding cost). The quantile is TYPE-1 (smallest demand with ECDF ≥
    0.9): target row index ceil(0.9·n) computed in INTEGERS as
    (9n+9) div 10 so there is no float boundary to disagree on; demand
    itself is an exact integer quantity sum.

    Scale shape: one (brand, day) hash agg after a broadcast part join;
    the quantile window partitions by brand (≤ |days| rows per
    partition, ~2.4k at any SF — keyed, never global)."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_shipdate", "l_quantity"
    )
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    daily = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("p_brand", F.to_date("l_shipdate").alias("day"))
        .agg(
            F.sum(F.round(F.col("l_quantity"), 0).cast("bigint"))
            .cast("long")
            .alias("q")
        )
    )
    w = Window.partitionBy("p_brand").orderBy(F.asc("q"), F.asc("day"))
    ranked = daily.withColumn("rn", F.row_number().over(w))
    counts = daily.groupBy("p_brand").agg(F.count(F.lit(1)).cast("long").alias("n"))
    target = ranked.join(F.broadcast(counts), "p_brand").filter(
        F.col("rn")
        == F.expr(f"({NV_CU} * n + {NV_CU}) div {NV_CU + NV_CO}")
    ).select("p_brand", F.col("q").alias("stock_q90"))
    base = daily.groupBy("p_brand").agg(
        F.count(F.lit(1)).cast("long").alias("n_days"),
        F.sum("q").cast("long").alias("tot_q"),
    )
    return (
        base.join(target, "p_brand")
        .select(
            "p_brand",
            "n_days",
            (F.col("tot_q").cast("double") / F.col("n_days").cast("double")).alias(
                "mean_daily_demand"
            ),
            F.col("stock_q90").cast("long").alias("stock_q90"),
            (
                F.col("stock_q90").cast("double")
                - F.col("tot_q").cast("double") / F.col("n_days").cast("double")
            ).alias("safety_stock"),
        )
        .orderBy("p_brand")
    )
q_newsvendor_quantile.__doc__ = q_newsvendor_quantile.__doc__ and q_newsvendor_quantile.__doc__.format(
        cu=NV_CU, co=NV_CO
    )


_ORACLE_NEWSVENDOR = f"""
WITH daily AS (
  SELECT p_brand, CAST(l_shipdate AS DATE) AS day,
         CAST(SUM(CAST(round(l_quantity, 0) AS BIGINT)) AS BIGINT) AS q
  FROM lineitem JOIN part ON l_partkey = p_partkey
  GROUP BY 1, 2
), ranked AS (
  SELECT p_brand, q,
         ROW_NUMBER() OVER (PARTITION BY p_brand ORDER BY q ASC, day ASC) AS rn
  FROM daily
), counts AS (
  SELECT p_brand, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(q) AS BIGINT) AS tot_q
  FROM daily GROUP BY 1
), target AS (
  SELECT r.p_brand, r.q AS stock_q90
  FROM ranked r JOIN counts c USING (p_brand)
  WHERE r.rn = ({NV_CU} * c.n + {NV_CU}) // {NV_CU + NV_CO}
)
SELECT c.p_brand, c.n AS n_days,
       CAST(c.tot_q AS DOUBLE) / CAST(c.n AS DOUBLE) AS mean_daily_demand,
       CAST(t.stock_q90 AS BIGINT) AS stock_q90,
       CAST(t.stock_q90 AS DOUBLE)
         - CAST(c.tot_q AS DOUBLE) / CAST(c.n AS DOUBLE) AS safety_stock
FROM counts c JOIN target t USING (p_brand)
ORDER BY p_brand
"""


ELAST_BAND_W = 10  # $-width of each retail-price band
ELAST_BASE = 900  # band origin (p_retailprice spans ~[900, 1000))
ELAST_BANDS = 10


def q_price_elasticity_arc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arc price elasticity of demand per brand: for each pair of
    ADJACENT retail-price bands (${w}-wide, origin ${b}), the midpoint
    formula ε = ((Q₂−Q₁)/((Q₁+Q₂)/2)) / ((P₂−P₁)/((P₁+P₂)/2)) — the
    elasticity estimator that needs NO logarithms (a log-log OLS is the
    textbook alternative; ln is banned from hash-gated values), using
    quantity sums per band as demand and the band's exact mean price.
    ε < −1 = elastic. Everything is rational: Q are integer quantity
    sums, P are cent-sum/count means, ε is one IEEE expression; a pair
    whose mean prices coincide yields NULL on both engines (documented
    degenerate contract).

    Scale shape: one (brand, band) hash agg after a broadcast part join
    (the scan is the only data-sized stage); the lag window runs on the
    ≤ |brand|·{n} grid."""
    li = load_table(spark, sf_dir, "lineitem").select("l_partkey", "l_quantity")
    part = load_table(spark, sf_dir, "part").select(
        "p_partkey", "p_brand", "p_retailprice"
    )
    pc = F.round(F.col("p_retailprice") * 100, 0).cast("bigint")
    band = F.least(
        F.lit(ELAST_BANDS - 1),
        F.greatest(
            F.lit(0),
            F.expr(
                f"(CAST(round(p_retailprice * 100, 0) AS BIGINT)"
                f" - {ELAST_BASE * 100}) div {ELAST_BAND_W * 100}"
            ),
        ),
    ).cast("int")
    per_band = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("p_brand", band.alias("band"))
        .agg(
            F.sum(F.round(F.col("l_quantity"), 0).cast("bigint"))
            .cast("long")
            .alias("qty"),
            F.sum(pc).cast("long").alias("pc_sum"),
            F.count(F.lit(1)).cast("long").alias("n_li"),
        )
    )
    w = Window.partitionBy("p_brand").orderBy("band")
    paired = per_band.select(
        "p_brand",
        "band",
        "qty",
        (F.col("pc_sum").cast("double") / F.col("n_li").cast("double")).alias("p"),
    ).select(
        "p_brand",
        "band",
        F.lag("band").over(w).alias("band_lo"),
        F.lag("qty").over(w).alias("q1"),
        F.col("qty").alias("q2"),
        F.lag("p").over(w).alias("p1"),
        F.col("p").alias("p2"),
    ).filter(F.col("band_lo").isNotNull())
    num = (F.col("q2") - F.col("q1")).cast("double") / (
        (F.col("q1") + F.col("q2")).cast("double") / F.lit(2.0)
    )
    den = (F.col("p2") - F.col("p1")) / ((F.col("p1") + F.col("p2")) / F.lit(2.0))
    return paired.select(
        "p_brand",
        F.col("band_lo").cast("int").alias("band_lo"),
        F.col("band").cast("int").alias("band_hi"),
        F.col("q1").cast("long").alias("qty_lo"),
        F.col("q2").cast("long").alias("qty_hi"),
        (num / F.nullif(den, F.lit(0.0))).alias("arc_elasticity"),
    ).orderBy("p_brand", "band_lo")
q_price_elasticity_arc.__doc__ = q_price_elasticity_arc.__doc__ and q_price_elasticity_arc.__doc__.format(w=ELAST_BAND_W, b=ELAST_BASE, n=ELAST_BANDS)


_ORACLE_ELASTICITY = f"""
WITH per_band AS (
  SELECT p_brand,
         LEAST({ELAST_BANDS - 1}, GREATEST(0,
           (CAST(round(p_retailprice * 100, 0) AS BIGINT) - {ELAST_BASE * 100})
             // {ELAST_BAND_W * 100})) AS band,
         CAST(SUM(CAST(round(l_quantity, 0) AS BIGINT)) AS BIGINT) AS qty,
         CAST(SUM(CAST(round(p_retailprice * 100, 0) AS BIGINT)) AS BIGINT) AS pc_sum,
         CAST(COUNT(*) AS BIGINT) AS n_li
  FROM lineitem JOIN part ON l_partkey = p_partkey
  GROUP BY 1, 2
), paired AS (
  SELECT p_brand, band,
         LAG(band) OVER w AS band_lo,
         LAG(qty) OVER w AS q1, qty AS q2,
         LAG(CAST(pc_sum AS DOUBLE) / CAST(n_li AS DOUBLE)) OVER w AS p1,
         CAST(pc_sum AS DOUBLE) / CAST(n_li AS DOUBLE) AS p2
  FROM per_band
  WINDOW w AS (PARTITION BY p_brand ORDER BY band)
)
SELECT p_brand,
       CAST(band_lo AS INTEGER) AS band_lo,
       CAST(band AS INTEGER) AS band_hi,
       CAST(q1 AS BIGINT) AS qty_lo,
       CAST(q2 AS BIGINT) AS qty_hi,
       (CAST(q2 - q1 AS DOUBLE) / (CAST(q1 + q2 AS DOUBLE) / 2.0))
         / NULLIF((p2 - p1) / ((p1 + p2) / 2.0), 0.0) AS arc_elasticity
FROM paired
WHERE band_lo IS NOT NULL
ORDER BY p_brand, band_lo
"""


# ---------------------------------------------------------------------------
# Economic order quantity (round 10 wave 6)
# ---------------------------------------------------------------------------

EOQ_SETUP_COST = 100.0  # ordering/setup cost per order, dollars (literal)
EOQ_HOLDING_RATE = 0.2  # annual holding cost as a fraction of unit price


def q_eoq_batch_sizing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Economic order quantity per brand: EOQ = √(2DS/H) with D = the
    brand's observed annual demand rate (total shipped quantity over the
    data's year span — exact integers, one division), S = ${s:.0f} setup
    cost per order (literal), H = {h:.0%} of the brand's mean unit retail
    price (exact cent rational) — the canonical batch-sizing formula
    every inventory planner runs, completing the ops-analytics shelf
    beside ``newsvendor_quantile`` (single-period) and ``xyz_demand_
    class`` (variability): EOQ answers the REPLENISHMENT cadence
    question. Ships the implied orders/year and the minimized total
    relevant cost √(2DSH).

    Exactness: D and H are ratios of exact integer sums; √ is the
    allowlisted correctly-rounded IEEE op; every shipped float is one
    fixed sequence. Scale shape: one lineitem⋈part hash agg to
    |brands| rows + one part-side agg — both map-side combinable."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    years = li.agg(
        (F.max(F.year("l_shipdate")) - F.min(F.year("l_shipdate")) + F.lit(1))
        .cast("long")
        .alias("n_years")
    )
    demand = (
        li.join(part.select("p_partkey", "p_brand"), li["l_partkey"] == part["p_partkey"])
        .groupBy("p_brand")
        .agg(F.sum(F.col("l_quantity").cast("bigint")).cast("long").alias("qty"))
    )
    price = part.groupBy("p_brand").agg(
        F.sum(F.round(F.col("p_retailprice") * 100, 0).cast("bigint"))
        .cast("long")
        .alias("pc"),
        F.count(F.lit(1)).cast("long").alias("np"),
    )
    j = demand.join(price, "p_brand").crossJoin(F.broadcast(years))
    d_rate = F.col("qty").cast("double") / F.col("n_years").cast("double")
    unit_price = F.col("pc").cast("double") / F.col("np").cast("double") / F.lit(100.0)
    h_cost = F.lit(EOQ_HOLDING_RATE) * unit_price
    eoq = F.sqrt(F.lit(2.0) * d_rate * F.lit(EOQ_SETUP_COST) / h_cost)
    return j.select(
        "p_brand",
        d_rate.alias("annual_demand"),
        unit_price.alias("mean_unit_price"),
        eoq.alias("eoq_units"),
        (d_rate / eoq).alias("orders_per_year"),
        F.sqrt(F.lit(2.0) * d_rate * F.lit(EOQ_SETUP_COST) * h_cost).alias(
            "total_relevant_cost"
        ),
    ).orderBy("p_brand")
q_eoq_batch_sizing.__doc__ = q_eoq_batch_sizing.__doc__ and q_eoq_batch_sizing.__doc__.format(
        s=EOQ_SETUP_COST, h=EOQ_HOLDING_RATE
    )


_ORACLE_EOQ = f"""
WITH years AS (
  SELECT CAST(MAX(year(l_shipdate)) - MIN(year(l_shipdate)) + 1 AS BIGINT) AS n_years
  FROM lineitem
), demand AS (
  SELECT p_brand, CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty
  FROM lineitem JOIN part ON l_partkey = p_partkey
  GROUP BY 1
), price AS (
  SELECT p_brand,
         CAST(SUM(CAST(round(p_retailprice * 100, 0) AS BIGINT)) AS BIGINT) AS pc,
         CAST(COUNT(*) AS BIGINT) AS np
  FROM part GROUP BY 1
), j AS (
  SELECT p_brand,
         CAST(qty AS DOUBLE) / CAST(n_years AS DOUBLE) AS d_rate,
         CAST(pc AS DOUBLE) / CAST(np AS DOUBLE) / 100.0 AS unit_price
  FROM demand JOIN price USING (p_brand) CROSS JOIN years
)
SELECT p_brand,
       d_rate AS annual_demand,
       unit_price AS mean_unit_price,
       sqrt(2.0 * d_rate * {EOQ_SETUP_COST!r} / ({EOQ_HOLDING_RATE!r} * unit_price))
         AS eoq_units,
       d_rate / sqrt(2.0 * d_rate * {EOQ_SETUP_COST!r} / ({EOQ_HOLDING_RATE!r} * unit_price))
         AS orders_per_year,
       sqrt(2.0 * d_rate * {EOQ_SETUP_COST!r} * ({EOQ_HOLDING_RATE!r} * unit_price))
         AS total_relevant_cost
FROM j
ORDER BY p_brand
"""


# ---------------------------------------------------------------------------
# Fill-rate curve (round 10 wave 13)
# ---------------------------------------------------------------------------

FILL_PCTS = [50, 75, 90]  # stock levels = these demand percentiles (literal)


def q_fill_rate_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fill-rate curve per brand: if stock per order is set at the P50 /
    P75 / P90 of observed per-order demand, what FRACTION OF UNITS ships
    from stock? Fill rate β = E[min(D, S)]/E[D] is the service measure
    customers actually feel (``newsvendor_quantile`` and ``otif_rate``
    grade order-level service α; a 95% α policy can still short-ship
    30% of UNITS on a fat-tailed demand mix) — the curve is the readout
    a planner uses to pick S.

    Exactness: stock levels are exact type-1 quantiles (integer index
    ⌈p·n⌉ on the per-brand ranked demand frame — no interpolation);
    E[min(D,S)]·n = Σ_{d≤S} d + S·|{d>S}| is INTEGER end-to-end; one
    division per (brand, p). Scale shape: one lineitem⋈part hash agg
    to (brand, demand) observations, per-brand rank windows (the
    bucketed global-rank decomposition drops in past one task), then a
    ≤|brands|×3 literal explode."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    obs = li.join(part, li["l_partkey"] == part["p_partkey"]).select(
        "p_brand", F.col("l_quantity").cast("long").alias("d")
    )
    w_rank = Window.partitionBy("p_brand").orderBy("d")
    w_all = Window.partitionBy("p_brand")
    ranked = obs.select(
        "p_brand",
        "d",
        F.row_number().over(w_rank).alias("rn"),
        F.count(F.lit(1)).over(w_all).alias("n"),
    )
    pcts = F.explode(F.array(*[F.lit(p) for p in FILL_PCTS])).alias("pct")
    # stock S_p = the type-1 quantile: value at index ceil(p*n/100)
    levels = (
        ranked.select("p_brand", "d", "rn", "n")
        .select("p_brand", "d", "rn", "n", pcts)
        .filter(F.col("rn") * 100 >= F.col("pct") * F.col("n"))
        .groupBy("p_brand", "pct")
        .agg(F.min("d").cast("long").alias("s"))
    )
    scored = obs.join(levels, "p_brand").select(
        "p_brand",
        "pct",
        "s",
        F.least(F.col("d"), F.col("s")).alias("shipped"),
        F.col("d").alias("demand"),
    )
    return (
        scored.groupBy("p_brand", "pct")
        .agg(
            F.max("s").alias("stock_level"),
            F.sum("shipped").cast("long").alias("units_shipped"),
            F.sum("demand").cast("long").alias("units_demanded"),
        )
        .select(
            "p_brand",
            F.col("pct").cast("int").alias("stock_percentile"),
            "stock_level",
            (
                F.col("units_shipped").cast("double")
                / F.col("units_demanded").cast("double")
            ).alias("fill_rate"),
        )
        .orderBy("p_brand", "stock_percentile")
    )


_ORACLE_FILL_RATE = f"""
WITH obs AS (
  SELECT p_brand, CAST(l_quantity AS BIGINT) AS d
  FROM lineitem JOIN part ON l_partkey = p_partkey
), ranked AS (
  SELECT p_brand, d,
         ROW_NUMBER() OVER (PARTITION BY p_brand ORDER BY d) AS rn,
         COUNT(*) OVER (PARTITION BY p_brand) AS n
  FROM obs
), levels AS (
  SELECT p_brand, pct, CAST(MIN(d) AS BIGINT) AS s
  FROM ranked CROSS JOIN (SELECT UNNEST(ARRAY{FILL_PCTS}) AS pct)
  WHERE rn * 100 >= pct * n
  GROUP BY 1, 2
), scored AS (
  SELECT obs.p_brand, pct, s,
         LEAST(d, s) AS shipped, d AS demand
  FROM obs JOIN levels USING (p_brand)
)
SELECT p_brand,
       CAST(pct AS INT) AS stock_percentile,
       MAX(s) AS stock_level,
       CAST(SUM(shipped) AS DOUBLE) / CAST(SUM(demand) AS DOUBLE) AS fill_rate
FROM scored
GROUP BY p_brand, pct
ORDER BY p_brand, stock_percentile
"""


# ---------------------------------------------------------------------------
# M/M/1 queueing metrics per supplier — round 11 wave
# ---------------------------------------------------------------------------

MM1_YEAR = 1997  # literal demand window
MM1_MU_PER_DAY = 4.0  # literal service capacity: jobs/day per supplier
MM1_DAYS = 365  # literal window length
MM1_TOP = 20


def q_queueing_mm1_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M/M/1 steady-state queueing metrics per supplier — turn the {y}
    order flow into the capacity-planning numbers an ops team actually
    asks for: utilization ρ = λ/μ, expected queue length L_q =
    ρ²/(1−ρ), expected wait W_q = L_q/λ (Little's law), for the {k}
    most-utilized suppliers under the literal μ = {mu}/day service
    capacity. The queueing complement of ``eoq_batch_sizing``
    (inventory) and ``fill_rate_curve`` (service level): all three read
    the same demand stream, each optimizing a different resource.

    Exactness: λ = n_jobs/{d} is one exact-integer division; ρ, L_q,
    W_q are one IEEE sequence on it; the M/M/1 formulas REQUIRE ρ < 1,
    so an over-capacity supplier (ρ ≥ 1 — the queue diverges) emits
    NULL metrics under an explicit guard rather than a negative queue
    length (both engines). Ranking is (ρ, suppkey) — deterministic.

    Scale shape: one fact-sized hash agg → per-supplier arithmetic →
    a top-{k} TakeOrdered. No shuffle beyond the agg."""
    lineitem = load_table(spark, sf_dir, "lineitem")
    jobs = (
        lineitem.filter(F.year("l_shipdate") == MM1_YEAR)
        .groupBy(F.col("l_suppkey").alias("suppkey"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_jobs"))
    )
    lam = F.col("n_jobs").cast("double") / F.lit(float(MM1_DAYS))
    rho = lam / F.lit(MM1_MU_PER_DAY)
    lq = rho * rho / (F.lit(1.0) - rho)
    stable = rho < 1.0
    return (
        jobs.select(
            "suppkey",
            "n_jobs",
            lam.alias("lambda_per_day"),
            rho.alias("rho"),
            F.when(stable, lq).alias("lq_jobs"),
            F.when(stable, lq / lam).alias("wq_days"),
        )
        .orderBy(F.desc("rho"), F.asc("suppkey"))
        .limit(MM1_TOP)
    )
q_queueing_mm1_metrics.__doc__ = q_queueing_mm1_metrics.__doc__ and q_queueing_mm1_metrics.__doc__.format(
        y=MM1_YEAR, mu=MM1_MU_PER_DAY, d=MM1_DAYS, k=MM1_TOP
    )


_ORACLE_MM1 = f"""
WITH jobs AS (
  SELECT l_suppkey AS suppkey, CAST(COUNT(*) AS BIGINT) AS n_jobs
  FROM lineitem WHERE year(l_shipdate) = {MM1_YEAR}
  GROUP BY 1
), m AS (
  SELECT suppkey, n_jobs,
         CAST(n_jobs AS DOUBLE) / {float(MM1_DAYS)!r} AS lam
  FROM jobs
)
SELECT suppkey, n_jobs,
       lam AS lambda_per_day,
       lam / {MM1_MU_PER_DAY!r} AS rho,
       CASE WHEN lam / {MM1_MU_PER_DAY!r} < 1.0 THEN
         (lam / {MM1_MU_PER_DAY!r}) * (lam / {MM1_MU_PER_DAY!r})
           / (1.0 - lam / {MM1_MU_PER_DAY!r}) END AS lq_jobs,
       CASE WHEN lam / {MM1_MU_PER_DAY!r} < 1.0 THEN
         ((lam / {MM1_MU_PER_DAY!r}) * (lam / {MM1_MU_PER_DAY!r})
           / (1.0 - lam / {MM1_MU_PER_DAY!r})) / lam END AS wq_days
FROM m
ORDER BY rho DESC, suppkey ASC
LIMIT {MM1_TOP}
"""


# ---------------------------------------------------------------------------
# Wagner-Whitin dynamic lot sizing — round 11 wave
# ---------------------------------------------------------------------------

WW_YEAR = 1997  # literal planning year
WW_T = 12  # literal period count (months)
WW_SETUP_CENTS = 50_000_00  # literal fixed order cost per setup
WW_HOLD_CENTS = 25  # literal holding cost per unit-month, in cents


def _ww_f_exprs():
    """The Wagner-Whitin DP f₁..f_T as a NESTED LEAST expression tree
    over the 78 c_{{j}}_{{t}} columns — the whole optimization is one
    declarative SELECT on a 1-row frame, no loop, no collect."""
    f = {0: None}  # f(0) = 0 — represented as absent addend
    exprs = {}
    for t in range(1, WW_T + 1):
        cands = []
        for j in range(1, t + 1):
            c = F.col(f"c_{j}_{t}")
            cands.append(c if f[j - 1] is None else f[j - 1] + c)
        e = cands[0]
        for c in cands[1:]:
            e = F.least(e, c)
        f[t] = e
        exprs[t] = e
    return exprs


def q_wagner_whitin_lot_sizing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wagner-Whitin dynamic lot sizing over the {y} monthly demand
    (total line quantity per month): the OPTIMAL order schedule cost
    under a fixed setup cost K plus linear holding cost h per
    unit-month — the exact-DP answer that ``eoq_batch_sizing``'s
    continuous approximation is benchmarked against (EOQ assumes
    stationary demand; WW handles the actual seasonal profile, and
    their gap prices the value of demand visibility).

    Spark-first formulation: with T = {t} literal periods the DP
    collapses to EXPRESSIONS — serving-run costs c(j,t) = K +
    h·Σ_{{i=j..t}}(i−j)·dᵢ are a {p}-cell conditional-sum agg over the
    zero-filled month frame (exact integer cents end-to-end), and the
    Bellman recursion f(t) = min_{{j≤t}} f(j−1)+c(j,t) unrolls into one
    nested LEAST tree on the 1-row cost frame — the entire optimizer
    is a single declarative SELECT, no loop, no collect, bit-exact on
    both engines (integer min). Scale shape: one fact-sized hash agg
    to 12 rows; everything after is literal-domain arithmetic. A
    large-T deployment swaps the unrolled tree for min-plus path
    doubling (log₂T tiny self-joins) — the mechanics, not the
    formulation, change."""
    lineitem = load_table(spark, sf_dir, "lineitem")
    monthly = (
        lineitem.filter(F.year("l_shipdate") == WW_YEAR)
        .groupBy(F.month("l_shipdate").alias("t"))
        .agg(F.sum(F.col("l_quantity").cast("long")).cast("long").alias("d"))
    )
    spine = spark.range(1, WW_T + 1).select(F.col("id").cast("int").alias("t"))
    dense = spine.join(monthly, "t", "left").select(
        "t", F.coalesce(F.col("d"), F.lit(0)).cast("long").alias("d")
    )
    cost_aggs = []
    for j in range(1, WW_T + 1):
        for t in range(j, WW_T + 1):
            hold = F.sum(
                F.when(
                    (F.col("t") >= j) & (F.col("t") <= t),
                    (F.col("t") - F.lit(j)).cast("long") * F.col("d"),
                ).otherwise(F.lit(0))
            )
            cost_aggs.append(
                (hold * F.lit(WW_HOLD_CENTS) + F.lit(WW_SETUP_CENTS))
                .cast("long")
                .alias(f"c_{j}_{t}")
            )
    costs = dense.agg(
        F.sum("d").cast("long").alias("total_demand_qty"), *cost_aggs
    )
    f = _ww_f_exprs()
    return costs.select(
        F.lit(WW_T).cast("int").alias("n_periods"),
        "total_demand_qty",
        F.lit(WW_SETUP_CENTS).cast("long").alias("setup_cost_cents"),
        F.lit(WW_HOLD_CENTS).cast("long").alias("holding_cents_per_unit_month"),
        f[WW_T].cast("long").alias("optimal_cost_cents"),
    )
q_wagner_whitin_lot_sizing.__doc__ = q_wagner_whitin_lot_sizing.__doc__ and q_wagner_whitin_lot_sizing.__doc__.format(
        y=WW_YEAR, t=WW_T, p=WW_T * (WW_T + 1) // 2
    )


def _sql_wagner_whitin() -> str:
    cost_cols = ", ".join(
        f"CAST(SUM(CASE WHEN t >= {j} AND t <= {t} THEN (t - {j}) * d ELSE 0 END)"
        f" * {WW_HOLD_CENTS} + {WW_SETUP_CENTS} AS BIGINT) AS c_{j}_{t}"
        for j in range(1, WW_T + 1)
        for t in range(j, WW_T + 1)
    )
    f_sql = {0: None}
    for t in range(1, WW_T + 1):
        cands = []
        for j in range(1, t + 1):
            c = f"c_{j}_{t}"
            cands.append(c if f_sql[j - 1] is None else f"({f_sql[j - 1]} + {c})")
        e = cands[0]
        for c in cands[1:]:
            e = f"LEAST({e}, {c})"
        f_sql[t] = e
    return f"""
WITH monthly AS (
  SELECT month(l_shipdate) AS t, CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS d
  FROM lineitem WHERE year(l_shipdate) = {WW_YEAR}
  GROUP BY 1
), spine AS (
  SELECT CAST(UNNEST(range(1, {WW_T + 1})) AS INT) AS t
), dense AS (
  SELECT spine.t, CAST(COALESCE(monthly.d, 0) AS BIGINT) AS d
  FROM spine LEFT JOIN monthly ON spine.t = monthly.t
), costs AS (
  SELECT CAST(SUM(d) AS BIGINT) AS total_demand_qty, {cost_cols}
  FROM dense
)
SELECT CAST({WW_T} AS INT) AS n_periods,
       total_demand_qty,
       CAST({WW_SETUP_CENTS} AS BIGINT) AS setup_cost_cents,
       CAST({WW_HOLD_CENTS} AS BIGINT) AS holding_cents_per_unit_month,
       CAST({f_sql[WW_T]} AS BIGINT) AS optimal_cost_cents
FROM costs
"""


# ---------------------------------------------------------------------------
# Base-stock (order-up-to) service-level evaluation (round 12)
# ---------------------------------------------------------------------------

BASE_STOCK_LEAD_M = 2  # protection interval: review period + lead = 2 months
# order-up-to level S = (NUM/DEN) x mean protection-interval demand,
# floored to an integer — 1.25x cover, integer arithmetic end-to-end
BASE_STOCK_NUM, BASE_STOCK_DEN = 5, 4


def q_inventory_base_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Periodic-review ORDER-UP-TO (base-stock) policy evaluation per
    part brand: with inventory position restored to S every review and
    backorders cleared on replenishment, period-t exposure is exactly
    the PROTECTION-INTERVAL demand D_t = demand over the trailing
    {L} months, so the textbook service metrics are closed-form in the
    demand series — no simulation state: α (cycle service) = fraction
    of periods with D_t ≤ S, per-period shortfall = max(0, D_t − S),
    β (fill rate) = 1 − Σshortfall/ΣD. This is the POLICY-evaluation
    member of the inventory family: ``eoq_batch_sizing`` sizes orders,
    ``newsvendor_quantile`` sizes one period, ``fill_rate_curve`` sweeps
    a quantity ladder, ``wagner_whitin_lot_sizing`` optimizes a known
    horizon — this entry scores a STANDING policy against realized
    demand. S = floor({NUM}·D̄_prot/{DEN}) per brand (integer via `div`
    on the summed protection demands, never a double quotient).

    Exactness: demand is integer quantity; D_t is a 2-term integer
    window sum; S is one integer division; every metric numerator stays
    an exact integer with ONE final IEEE division per reported ratio.
    First protection window needs {L} months — earlier periods excluded
    (count gate, both engines).

    Scale shape: one lineitem⋈part broadcast-dim join → (brand, month)
    hash agg (25×|months| rows) → brand-keyed lag window → 25-row
    output. Map-side combinable throughout.

    Reference analog: none (engine addition, SURVEY.md §2.7)."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey",
        F.col("l_quantity").cast("long").alias("qty"),
        (F.year("l_shipdate") * 12 + F.month("l_shipdate")).alias("mid"),
    )
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    monthly = (
        li.join(F.broadcast(part), li["l_partkey"] == part["p_partkey"])
        .groupBy("p_brand", "mid")
        .agg(F.sum("qty").cast("long").alias("d"))
    )
    w = Window.partitionBy("p_brand").orderBy("mid").rowsBetween(
        -(BASE_STOCK_LEAD_M - 1), 0
    )
    prot = monthly.select(
        "p_brand",
        "mid",
        F.sum("d").over(w).cast("long").alias("d_prot"),
        F.count(F.lit(1)).over(w).alias("n_win"),
    ).filter(F.col("n_win") == BASE_STOCK_LEAD_M)
    level = prot.groupBy("p_brand").agg(
        F.expr(
            f"CAST(({BASE_STOCK_NUM} * sum(d_prot)) div"
            f" ({BASE_STOCK_DEN} * count(1)) AS BIGINT)"
        ).alias("s_level")
    )
    scored = prot.join(F.broadcast(level), "p_brand")
    out = scored.groupBy("p_brand").agg(
        F.count(F.lit(1)).cast("long").alias("n_periods"),
        F.max("s_level").alias("s_level"),
        F.sum("d_prot").cast("long").alias("total_demand"),
        F.sum(F.when(F.col("d_prot") <= F.col("s_level"), 1).otherwise(0))
        .cast("long")
        .alias("n_cycles_ok"),
        F.sum(F.greatest(F.lit(0).cast("long"), F.col("d_prot") - F.col("s_level")))
        .cast("long")
        .alias("total_shortfall"),
    )
    return out.select(
        "p_brand",
        "n_periods",
        "s_level",
        "total_shortfall",
        (
            F.col("n_cycles_ok").cast("double") / F.col("n_periods").cast("double")
        ).alias("alpha_service"),
        (
            F.lit(1.0)
            - F.col("total_shortfall").cast("double")
            / F.col("total_demand").cast("double")
        ).alias("beta_fill_rate"),
    ).orderBy("p_brand")
q_inventory_base_stock.__doc__ = q_inventory_base_stock.__doc__ and q_inventory_base_stock.__doc__.format(
        L=BASE_STOCK_LEAD_M, NUM=BASE_STOCK_NUM, DEN=BASE_STOCK_DEN
    )


_ORACLE_BASE_STOCK = f"""
WITH monthly AS (
  SELECT p_brand,
         CAST(EXTRACT(YEAR FROM l_shipdate) * 12 + EXTRACT(MONTH FROM l_shipdate) AS BIGINT) AS mid,
         CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS d
  FROM lineitem JOIN part ON l_partkey = p_partkey
  GROUP BY 1, 2
), prot AS (
  SELECT p_brand, mid,
         CAST(SUM(d) OVER (PARTITION BY p_brand ORDER BY mid
            ROWS BETWEEN {BASE_STOCK_LEAD_M - 1} PRECEDING AND CURRENT ROW) AS BIGINT) AS d_prot,
         COUNT(*) OVER (PARTITION BY p_brand ORDER BY mid
            ROWS BETWEEN {BASE_STOCK_LEAD_M - 1} PRECEDING AND CURRENT ROW) AS n_win
  FROM monthly
), prot_ok AS (
  SELECT p_brand, d_prot FROM prot WHERE n_win = {BASE_STOCK_LEAD_M}
), level AS (
  SELECT p_brand,
         ({BASE_STOCK_NUM} * SUM(d_prot)) // ({BASE_STOCK_DEN} * COUNT(*)) AS s_level
  FROM prot_ok GROUP BY 1
), out AS (
  SELECT p.p_brand,
         CAST(COUNT(*) AS BIGINT) AS n_periods,
         CAST(MAX(l.s_level) AS BIGINT) AS s_level,
         CAST(SUM(p.d_prot) AS BIGINT) AS total_demand,
         CAST(SUM(CASE WHEN p.d_prot <= l.s_level THEN 1 ELSE 0 END) AS BIGINT) AS n_cycles_ok,
         CAST(SUM(GREATEST(0, p.d_prot - l.s_level)) AS BIGINT) AS total_shortfall
  FROM prot_ok p JOIN level l ON p.p_brand = l.p_brand
  GROUP BY 1
)
SELECT p_brand, n_periods, s_level, total_shortfall,
       CAST(n_cycles_ok AS DOUBLE) / CAST(n_periods AS DOUBLE) AS alpha_service,
       1.0 - CAST(total_shortfall AS DOUBLE) / CAST(total_demand AS DOUBLE) AS beta_fill_rate
FROM out
ORDER BY p_brand
"""


# ---------------------------------------------------------------------------
# M/M/c Erlang-C queueing metrics (round 13 late)
# ---------------------------------------------------------------------------

MMC_C = 4  # literal server count — the Erlang sums unroll to 5 terms


def _mmc_tree() -> dict[str, str]:
    """Erlang C for literal c = MMC_C as ONE shared expression text over
    the double columns lam (jobs/day) and a (offered load λ/μ): with
    factorials folded as literals, P_wait = (a^c/c!)/(1−ρ) / (Σ_{k<c}
    a^k/k! + (a^c/c!)/(1−ρ)) is pure rational arithmetic."""
    import math as _m

    rho = f"(a / {float(MMC_C)!r})"
    top = f"((a * a * a * a / {float(_m.factorial(MMC_C))!r}) / (1.0 - {rho}))"
    s = " + ".join(
        f"({' * '.join(['a'] * k) if k else '1.0'} / {float(_m.factorial(k))!r})"
        for k in range(MMC_C)
    )
    pw = f"({top} / (({s}) + {top}))"
    lq = f"({pw} * {rho} / (1.0 - {rho}))"
    return {"rho": rho, "pw": pw, "lq": lq, "wq": f"({lq} / lam)"}


def q_queueing_mmc_erlang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M/M/c steady-state metrics per supplier at c = 4 parallel servers
    (same λ/μ construction as ``queueing_mm1_metrics``): Erlang-C
    waiting probability P_wait, expected queue length L_q =
    P_wait·ρ/(1−ρ) and wait W_q — the MULTI-server answer to the
    capacity question M/M/1 can only ask for one server (pooling four
    servers is NOT four independent M/M/1 queues, and the Erlang-C gap
    between the two is the classic case for pooling). The c = 4
    literal makes the Erlang sums unroll to five rational terms —
    factorials are Python-folded literals, no Γ function anywhere.

    Exactness: λ is one exact-integer division; the offered load
    a = λ/μ, ρ = a/c, and the whole Erlang-C expression are a SINGLE
    shared expression text evaluated by F.expr and the oracle
    (identical IEEE tree). Over-capacity suppliers (ρ ≥ 1) emit NULL
    metrics under an explicit guard. Ranking (ρ desc, suppkey) is
    deterministic.

    Scale shape: one fact-sized hash agg → per-supplier literal-degree
    polynomial arithmetic → top-20 TakeOrdered.

    Reference analog: none (engine addition, SURVEY.md §2.7)."""
    lineitem = load_table(spark, sf_dir, "lineitem")
    jobs = (
        lineitem.filter(F.year("l_shipdate") == MM1_YEAR)
        .groupBy(F.col("l_suppkey").alias("suppkey"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_jobs"))
    )
    t = _mmc_tree()
    based = jobs.select(
        "suppkey",
        "n_jobs",
        (F.col("n_jobs").cast("double") / F.lit(float(MM1_DAYS))).alias("lam"),
    ).withColumn("a", F.col("lam") / F.lit(MM1_MU_PER_DAY))
    stable = F.expr(t["rho"]) < 1.0
    return (
        based.select(
            "suppkey",
            "n_jobs",
            F.col("lam").alias("lambda_per_day"),
            F.expr(t["rho"]).alias("rho"),
            F.when(stable, F.expr(t["pw"])).alias("p_wait"),
            F.when(stable, F.expr(t["lq"])).alias("lq_jobs"),
            F.when(stable, F.expr(t["wq"])).alias("wq_days"),
        )
        .orderBy(F.desc("rho"), F.asc("suppkey"))
        .limit(MM1_TOP)
    )


def _sql_mmc() -> str:
    t = _mmc_tree()
    return f"""
WITH jobs AS (
  SELECT l_suppkey AS suppkey, CAST(COUNT(*) AS BIGINT) AS n_jobs
  FROM lineitem WHERE year(l_shipdate) = {MM1_YEAR}
  GROUP BY 1
), based AS (
  SELECT suppkey, n_jobs,
         CAST(n_jobs AS DOUBLE) / {float(MM1_DAYS)!r} AS lam,
         (CAST(n_jobs AS DOUBLE) / {float(MM1_DAYS)!r}) / {MM1_MU_PER_DAY!r} AS a
  FROM jobs
)
SELECT suppkey, n_jobs,
       lam AS lambda_per_day,
       {t['rho']} AS rho,
       CASE WHEN {t['rho']} < 1.0 THEN {t['pw']} END AS p_wait,
       CASE WHEN {t['rho']} < 1.0 THEN {t['lq']} END AS lq_jobs,
       CASE WHEN {t['rho']} < 1.0 THEN {t['wq']} END AS wq_days
FROM based
ORDER BY rho DESC, suppkey ASC
LIMIT {MM1_TOP}
"""


# ---------------------------------------------------------------------------
# Periodic-review (s,S) policy simulation (round 13)
# ---------------------------------------------------------------------------

SS_T = 12  # literal simulation horizon: the WW_YEAR months


def _ss_chain_snippets():
    """The month-by-month (s,S) simulation as named-column chain
    snippets shared verbatim by F.expr and the oracle CTE chain —
    state after month t is (pos_t on hand, lost_t cumulative lost
    sales, ord_t cumulative orders), all exact integers."""
    steps = []
    for t in range(1, SS_T + 1):
        avail = f"CASE WHEN pos{t - 1} < s_small THEN s_big ELSE pos{t - 1} END"
        steps.append(
            [
                (f"av{t}", avail),
                (f"sold{t}", f"LEAST(d{t}, av{t})"),
                (f"pos{t}", f"av{t} - sold{t}"),
                (f"lost{t}", f"lost{t - 1} + (d{t} - sold{t})"),
                (
                    f"ord{t}",
                    f"ord{t - 1} + CASE WHEN pos{t - 1} < s_small THEN 1 ELSE 0 END",
                ),
            ]
        )
    return steps


def q_inventory_ss_policy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Periodic-review (s,S) ['min-max'] inventory policy SIMULATED
    month by month per part brand over the WW planning year (lost-
    sales semantics, zero lead time): at each review, if the on-hand
    position fell below the reorder point s, order UP TO S; demand
    then consumes stock and unmet demand is LOST (counted, not
    backordered). The genuinely SEQUENTIAL member of the inventory
    family — ``inventory_base_stock`` is closed-form because order-
    up-to-every-period decouples the periods; (s,S) couples them (the
    skip-review state carries over), so the realized order count, lost
    sales and fill rate are path quantities no single aggregate can
    produce. S = (2·annual demand) div 12 (twice the mean month),
    s = S div 2 — integer div on both engines.

    Spark-first formulation: monthly demands pivot onto the LITERAL
    12-month domain as columns d1..d12 (one hash agg to ≤|brands|
    rows); the simulation unrolls as a chain of NAMED integer state
    columns (avail/sold/pos/lost/orders per month — the
    ``silver_meal_lot_sizing`` named-chain pattern, O(T) expression
    per step), bit-exact CASE/LEAST algebra on both engines; the
    oracle replays the identical generated snippets through a CTE
    chain. Fill rate is ONE final division (guarded for a zero-demand
    brand-year).

    Scale shape: one fact⋈dim broadcast join → one (brand, month)
    hash agg → literal-domain integer arithmetic on a ≤|brands|-row
    frame. No window, no loop over data.

    Reference analog: none (engine addition, SURVEY.md §2.7)."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey",
        F.col("l_quantity").cast("long").alias("qty"),
        F.month("l_shipdate").alias("m"),
        F.year("l_shipdate").alias("y"),
    ).filter(F.col("y") == WW_YEAR)
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    monthly = (
        li.join(F.broadcast(part), li["l_partkey"] == part["p_partkey"])
        .groupBy("p_brand")
        .agg(
            *[
                F.sum(F.when(F.col("m") == t, F.col("qty")).otherwise(0))
                .cast("long")
                .alias(f"d{t}")
                for t in range(1, SS_T + 1)
            ]
        )
    )
    total = "(" + " + ".join(f"d{t}" for t in range(1, SS_T + 1)) + ")"
    state = (
        monthly.withColumn("total_demand", F.expr(total).cast("long"))
        .withColumn("s_big", F.expr(f"(2 * {total}) div {SS_T}").cast("long"))
        .withColumn("s_small", F.expr("s_big div 2").cast("long"))
        .withColumn("pos0", F.col("s_big"))
        .withColumn("lost0", F.lit(0).cast("long"))
        .withColumn("ord0", F.lit(0).cast("long"))
    )
    for cols in _ss_chain_snippets():
        for name, sql in cols:
            state = state.withColumn(name, F.expr(sql).cast("long"))
    ok = F.col("total_demand") > 0
    return state.select(
        "p_brand",
        "s_small",
        "s_big",
        "total_demand",
        F.col(f"ord{SS_T}").alias("n_orders"),
        F.col(f"lost{SS_T}").alias("total_lost"),
        F.when(
            ok,
            F.lit(1.0)
            - F.col(f"lost{SS_T}").cast("double")
            / F.col("total_demand").cast("double"),
        ).alias("fill_rate"),
        F.col(f"pos{SS_T}").alias("end_position"),
    ).orderBy("p_brand")


def _sql_ss_policy() -> str:
    d_cols = ",\n         ".join(
        f"CAST(SUM(CASE WHEN month(l_shipdate) = {t} THEN CAST(l_quantity AS BIGINT) ELSE 0 END) AS BIGINT) AS d{t}"
        for t in range(1, SS_T + 1)
    )
    total = "(" + " + ".join(f"d{t}" for t in range(1, SS_T + 1)) + ")"
    ctes = [
        "s0 AS (SELECT *, "
        f"CAST({total} AS BIGINT) AS total_demand, "
        f"CAST((2 * {total}) // {SS_T} AS BIGINT) AS s_big, "
        f"CAST(((2 * {total}) // {SS_T}) // 2 AS BIGINT) AS s_small, "
        f"CAST((2 * {total}) // {SS_T} AS BIGINT) AS pos0, "
        "CAST(0 AS BIGINT) AS lost0, CAST(0 AS BIGINT) AS ord0 FROM monthly)"
    ]
    for i, cols in enumerate(_ss_chain_snippets(), start=1):
        adds = ", ".join(f"CAST({sql} AS BIGINT) AS {name}" for name, sql in cols)
        ctes.append(f"s{i} AS (SELECT *, {adds} FROM s{i - 1})")
    chain = ",\n".join(ctes)
    return f"""
WITH monthly AS (
  SELECT p_brand,
         {d_cols}
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE year(l_shipdate) = {WW_YEAR}
  GROUP BY 1
),
{chain}
SELECT p_brand, s_small, s_big, total_demand,
       ord{SS_T} AS n_orders,
       lost{SS_T} AS total_lost,
       CASE WHEN total_demand > 0
            THEN 1.0 - CAST(lost{SS_T} AS DOUBLE) / CAST(total_demand AS DOUBLE)
       END AS fill_rate,
       pos{SS_T} AS end_position
FROM s{SS_T}
ORDER BY p_brand
"""


# ---------------------------------------------------------------------------
# Silver-Meal lot-sizing heuristic (round 13)
# ---------------------------------------------------------------------------


def _sm_step_snippets():
    """The Silver-Meal forward recursion as NAMED-COLUMN chain snippets
    (shared verbatim by F.expr and the oracle CTE chain): state after
    period t is (j_t = current run start, cost_t = cents of completed
    runs, n_t = orders so far), each one small CASE expression over the
    previous step's named columns — O(T) text per step, no expression
    blow-up. Returns ([(col_name, sql)...] per step, final_cost_sql)."""
    steps = []
    for t in range(2, WW_T + 1):
        dec_t = (
            "CASE j%d %s END"
            % (t - 1, " ".join(f"WHEN {j} THEN c_{j}_{t}" for j in range(1, t)))
        )
        dec_p = (
            "CASE j%d %s END"
            % (t - 1, " ".join(f"WHEN {j} THEN c_{j}_{t - 1}" for j in range(1, t)))
        )
        ext = f"(({dec_t}) * ({t} - j{t - 1}) <= ({dec_p}) * ({t} - j{t - 1} + 1))"
        steps.append(
            [
                (f"j{t}", f"CASE WHEN {ext} THEN j{t - 1} ELSE {t} END"),
                (
                    f"cost{t}",
                    f"CASE WHEN {ext} THEN cost{t - 1}"
                    f" ELSE cost{t - 1} + ({dec_p}) END",
                ),
                (f"n{t}", f"CASE WHEN {ext} THEN n{t - 1} ELSE n{t - 1} + 1 END"),
            ]
        )
    final = "CASE j%d %s END" % (
        WW_T,
        " ".join(f"WHEN {j} THEN c_{j}_{WW_T}" for j in range(1, WW_T + 1)),
    )
    return steps, f"cost{WW_T} + ({final})"


def q_silver_meal_lot_sizing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Silver-Meal lot-sizing HEURISTIC on the same monthly demand,
    setup and holding costs as ``wagner_whitin_lot_sizing``, reported
    side-by-side with the WW optimum: extend the current order to cover
    the next period while the average cost PER PERIOD of the run does
    not increase, else place a new order (Silver & Meal 1973) — the
    industry-standard O(T) planning rule whose gap to the exact DP is
    the textbook 'cost of the myopic rule' table, computed here in one
    query (gap ≥ 0 is a built-in invariant the crafted test pins).

    Spark-first formulation: the same 78-cell exact-integer c(j,t) cost
    frame as WW, then the forward recursion unrolled as a chain of
    NAMED state columns — j_t (current run start) decoded by VALUE with
    one ≤t-way CASE per step, the extend decision as an exact INTEGER
    cross-multiplication c(j,t)·(t−j) ≤ c(j,t−1)·(t−j+1) (no average is
    ever divided), cost/order accumulators as integer CASEs — O(T²)
    total expression, no loop, no collect, bit-exact on both engines.
    The oracle mirrors the identical snippets through a CTE chain.

    Scale shape: one fact-sized hash agg to 12 rows; everything after
    is literal-domain arithmetic on a 1-row frame.

    Reference analog: none (engine addition, SURVEY.md §2.7)."""
    lineitem = load_table(spark, sf_dir, "lineitem")
    monthly = (
        lineitem.filter(F.year("l_shipdate") == WW_YEAR)
        .groupBy(F.month("l_shipdate").alias("t"))
        .agg(F.sum(F.col("l_quantity").cast("long")).cast("long").alias("d"))
    )
    spine = spark.range(1, WW_T + 1).select(F.col("id").cast("int").alias("t"))
    dense = spine.join(monthly, "t", "left").select(
        "t", F.coalesce(F.col("d"), F.lit(0)).cast("long").alias("d")
    )
    cost_aggs = []
    for j in range(1, WW_T + 1):
        for t in range(j, WW_T + 1):
            hold = F.sum(
                F.when(
                    (F.col("t") >= j) & (F.col("t") <= t),
                    (F.col("t") - F.lit(j)).cast("long") * F.col("d"),
                ).otherwise(F.lit(0))
            )
            cost_aggs.append(
                (hold * F.lit(WW_HOLD_CENTS) + F.lit(WW_SETUP_CENTS))
                .cast("long")
                .alias(f"c_{j}_{t}")
            )
    costs = dense.agg(
        F.sum("d").cast("long").alias("total_demand_qty"), *cost_aggs
    )
    state = costs.withColumn("j1", F.lit(1)).withColumn(
        "cost1", F.lit(0).cast("long")
    ).withColumn("n1", F.lit(1))
    steps, final_cost = _sm_step_snippets()
    for cols in steps:
        for name, sql in cols:
            state = state.withColumn(name, F.expr(sql))
    ww = _ww_f_exprs()
    return state.select(
        F.lit(WW_T).cast("int").alias("n_periods"),
        "total_demand_qty",
        F.expr(final_cost).cast("long").alias("sm_cost_cents"),
        F.col(f"n{WW_T}").cast("int").alias("sm_n_orders"),
        ww[WW_T].cast("long").alias("ww_optimal_cost_cents"),
        (F.expr(final_cost).cast("long") - ww[WW_T].cast("long"))
        .cast("long")
        .alias("sm_gap_cents"),
    )


def _sql_silver_meal() -> str:
    cost_cols = ", ".join(
        f"CAST(SUM(CASE WHEN t >= {j} AND t <= {t} THEN (t - {j}) * d ELSE 0 END)"
        f" * {WW_HOLD_CENTS} + {WW_SETUP_CENTS} AS BIGINT) AS c_{j}_{t}"
        for j in range(1, WW_T + 1)
        for t in range(j, WW_T + 1)
    )
    f_sql = {0: None}
    for t in range(1, WW_T + 1):
        cands = []
        for j in range(1, t + 1):
            c = f"c_{j}_{t}"
            cands.append(c if f_sql[j - 1] is None else f"({f_sql[j - 1]} + {c})")
        e = cands[0]
        for c in cands[1:]:
            e = f"LEAST({e}, {c})"
        f_sql[t] = e
    steps, final_cost = _sm_step_snippets()
    ctes = ["s1 AS (SELECT *, 1 AS j1, CAST(0 AS BIGINT) AS cost1, 1 AS n1 FROM costs)"]
    for i, cols in enumerate(steps, start=2):
        adds = ", ".join(f"{sql} AS {name}" for name, sql in cols)
        ctes.append(f"s{i} AS (SELECT *, {adds} FROM s{i - 1})")
    chain = ",\n".join(ctes)
    return f"""
WITH monthly AS (
  SELECT month(l_shipdate) AS t, CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS d
  FROM lineitem WHERE year(l_shipdate) = {WW_YEAR}
  GROUP BY 1
), spine AS (
  SELECT CAST(UNNEST(range(1, {WW_T + 1})) AS INT) AS t
), dense AS (
  SELECT spine.t, CAST(COALESCE(monthly.d, 0) AS BIGINT) AS d
  FROM spine LEFT JOIN monthly ON spine.t = monthly.t
), costs AS (
  SELECT CAST(SUM(d) AS BIGINT) AS total_demand_qty, {cost_cols}
  FROM dense
),
{chain}
SELECT CAST({WW_T} AS INT) AS n_periods,
       total_demand_qty,
       CAST({final_cost} AS BIGINT) AS sm_cost_cents,
       CAST(n{WW_T} AS INT) AS sm_n_orders,
       CAST({f_sql[WW_T]} AS BIGINT) AS ww_optimal_cost_cents,
       CAST(({final_cost}) - ({f_sql[WW_T]}) AS BIGINT) AS sm_gap_cents
FROM s{WW_T}
"""


# ---------------------------------------------------------------------------
# M/G/1 Pollaczek-Khinchine queueing metrics (round 14)
# ---------------------------------------------------------------------------

MG1_TOP = 20
MG1_UNITS_PER_DAY = 128.0  # literal service rate; /128 is an exact IEEE scale


def q_queueing_mg1_pk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M/G/1 queueing metrics per supplier via the Pollaczek-Khinchine
    formula — the step past ``queueing_mm1_metrics`` every ops review
    takes once it notices service times are NOT exponential: here the
    service distribution is MEASURED from the data (service time ∝
    line quantity at the literal {u} units/day rate — the quantity
    spread is what makes c_s² ≠ 1 here), and L_q = λ²·E[S²] / (2(1−ρ)) prices exactly how
    much the service-time VARIANCE (not just its mean) inflates the
    queue — at equal ρ, an SCV of 2 doubles the M/M/1 queue. Reported
    with the squared coefficient of variation c_s² so the M/M/1
    comparison (c_s² = 1) is one glance.

    Exactness: per supplier, n, Σq, Σq² of the integer quantities are
    one exact hash agg (Σq² in DECIMAL(38,0), limb-exact rebuild);
    λ = n/{d}, E[S] = Σq/(n·{u}) (the /2⁷ scale is exact in IEEE), and
    every P-K quantity is one fixed IEEE sequence on them. Degenerate contract: ρ ≥ 1 (queue diverges) or zero mean
    service → NULL metrics under explicit guards. Ranking is (ρ desc,
    suppkey) — deterministic.

    Scale shape: one fact-sized map-side-combinable hash agg → per-
    supplier arithmetic → top-{k} TakeOrdered. No shuffle beyond the
    agg.

    Reference analog: none (engine addition, SURVEY.md §2.7)."""
    lineitem = load_table(spark, sf_dir, "lineitem")
    qty = F.col("l_quantity").cast("long")
    jobs = (
        lineitem.filter(F.year("l_shipdate") == MM1_YEAR)
        .groupBy(F.col("l_suppkey").alias("suppkey"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_jobs"),
            F.sum(qty).cast("long").alias("s1"),
            F.sum((qty * qty).cast("decimal(38,0)"))
            .cast("decimal(38,0)")
            .alias("s2"),
        )
    )
    nd = F.col("n_jobs").cast("double")
    lam = nd / F.lit(float(MM1_DAYS))
    es = F.col("s1").cast("double") / nd / F.lit(MG1_UNITS_PER_DAY)
    es2 = dec_to_double(F.col("s2")) / nd / F.lit(
        MG1_UNITS_PER_DAY * MG1_UNITS_PER_DAY
    )
    rho = lam * es
    var_s = es2 - es * es
    cs2 = var_s / (es * es)
    lq = lam * lam * es2 / (F.lit(2.0) * (F.lit(1.0) - rho))
    ok = (rho < 1.0) & (es > 0)
    return (
        jobs.select(
            "suppkey",
            "n_jobs",
            lam.alias("lambda_per_day"),
            es.alias("es_days"),
            F.when(es > 0, cs2).alias("cs2"),
            rho.alias("rho"),
            F.when(ok, lq).alias("lq_jobs"),
            F.when(ok, lq / lam).alias("wq_days"),
        )
        .orderBy(F.desc("rho"), F.asc("suppkey"))
        .limit(MG1_TOP)
    )


q_queueing_mg1_pk.__doc__ = q_queueing_mg1_pk.__doc__ and (
    q_queueing_mg1_pk.__doc__.format(
        d=MM1_DAYS, k=MG1_TOP, u=int(MG1_UNITS_PER_DAY)
    )
)


def _sql_queueing_mg1() -> str:
    sd = "CAST(l_quantity AS BIGINT)"
    u = MG1_UNITS_PER_DAY
    return f"""
WITH jobs AS (
  SELECT l_suppkey AS suppkey,
         CAST(COUNT(*) AS BIGINT) AS n_jobs,
         CAST(SUM({sd}) AS BIGINT) AS s1,
         CAST(SUM(CAST({sd} * {sd} AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS s2
  FROM lineitem
  WHERE year(l_shipdate) = {MM1_YEAR}
  GROUP BY 1
), m AS (
  SELECT suppkey, n_jobs,
         CAST(n_jobs AS DOUBLE) / {float(MM1_DAYS)!r} AS lam,
         CAST(s1 AS DOUBLE) / CAST(n_jobs AS DOUBLE) / {u!r} AS es,
         {sql_dec_to_double("s2")} / CAST(n_jobs AS DOUBLE) / {u * u!r} AS es2
  FROM jobs
), fin AS (
  SELECT suppkey, n_jobs, lam, es, es2,
         lam * es AS rho,
         lam * lam * es2 / (2.0 * (1.0 - lam * es)) AS lq
  FROM m
)
SELECT suppkey, n_jobs,
       lam AS lambda_per_day,
       es AS es_days,
       CASE WHEN es > 0 THEN (es2 - es * es) / (es * es) END AS cs2,
       rho,
       CASE WHEN rho < 1.0 AND es > 0 THEN lq END AS lq_jobs,
       CASE WHEN rho < 1.0 AND es > 0 THEN lq / lam END AS wq_days
FROM fin
ORDER BY rho DESC, suppkey ASC
LIMIT {MG1_TOP}
"""


# ---------------------------------------------------------------------------
# M/M/1/K finite-capacity blocking (round 14)
# ---------------------------------------------------------------------------

MM1K_CAP = 10  # literal system capacity (queue + service)
MM1K_TOP = 20


def q_queueing_mm1k_blocking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M/M/1/K finite-capacity queueing per supplier at the literal
    K = {cap}: blocking probability P_K = ρ^K(1−ρ)/(1−ρ^(K+1)),
    expected system size L = ρ(1 − (K+1)ρ^K + Kρ^(K+1)) /
    ((1−ρ)(1−ρ^(K+1))), and the effective (admitted) throughput
    λ_eff = λ(1−P_K). The finite-buffer complement of
    ``queueing_mm1_metrics``: the infinite-queue model NULLs out at
    ρ ≥ 1, while the K-capacity system stays well-defined at ANY load —
    overloaded suppliers simply shed λ·P_K jobs/day, which is the
    number a capacity review actually needs.

    Exactness: λ = n/{d} is one exact division; ρ^K and ρ^(K+1) are
    explicit MULTIPLICATION CHAINS through named columns (r2 = ρ·ρ,
    r4 = r2·r2, r8 = r4·r4, r10 = r8·r2, r11 = r10·ρ — no pow(), which
    the determinism contract bans on data), so every output is a fixed
    IEEE sequence on both engines. Degenerate contract: the removable
    singularity at ρ = 1 (all formulas → 0/0; the limits are
    P_K = 1/(K+1), L = K/2) is handled by an explicit ρ = 1 branch —
    measure-zero on real data but contractually total.

    Scale shape: one fact-sized hash agg → per-supplier arithmetic →
    top-{k} TakeOrdered.

    Reference analog: none (engine addition, SURVEY.md §2.7)."""
    lineitem = load_table(spark, sf_dir, "lineitem")
    jobs = (
        lineitem.filter(F.year("l_shipdate") == MM1_YEAR)
        .groupBy(F.col("l_suppkey").alias("suppkey"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_jobs"))
    )
    lam = F.col("n_jobs").cast("double") / F.lit(float(MM1_DAYS))
    st = jobs.select(
        "suppkey", "n_jobs", lam.alias("lam"), (lam / F.lit(MM1_MU_PER_DAY)).alias("rho")
    )
    st = (
        st.withColumn("r2", F.col("rho") * F.col("rho"))
        .withColumn("r4", F.col("r2") * F.col("r2"))
        .withColumn("r8", F.col("r4") * F.col("r4"))
        .withColumn("r10", F.col("r8") * F.col("r2"))
        .withColumn("r11", F.col("r10") * F.col("rho"))
    )
    k = float(MM1K_CAP)
    at_one = F.col("rho") == 1.0
    pk = F.when(
        at_one, F.lit(1.0 / (MM1K_CAP + 1))
    ).otherwise(
        F.col("r10") * (F.lit(1.0) - F.col("rho")) / (F.lit(1.0) - F.col("r11"))
    )
    l_sys = F.when(at_one, F.lit(k / 2.0)).otherwise(
        F.col("rho")
        * (
            F.lit(1.0)
            - F.lit(k + 1.0) * F.col("r10")
            + F.lit(k) * F.col("r11")
        )
        / ((F.lit(1.0) - F.col("rho")) * (F.lit(1.0) - F.col("r11")))
    )
    st = st.withColumn("p_block", pk)
    return (
        st.select(
            "suppkey",
            "n_jobs",
            F.col("lam").alias("lambda_per_day"),
            "rho",
            "p_block",
            l_sys.alias("l_system"),
            (F.col("lam") * (F.lit(1.0) - F.col("p_block"))).alias(
                "lambda_eff_per_day"
            ),
        )
        .orderBy(F.desc("rho"), F.asc("suppkey"))
        .limit(MM1K_TOP)
    )


q_queueing_mm1k_blocking.__doc__ = q_queueing_mm1k_blocking.__doc__ and (
    q_queueing_mm1k_blocking.__doc__.format(cap=MM1K_CAP, d=MM1_DAYS, k=MM1K_TOP)
)


def _sql_queueing_mm1k() -> str:
    k = float(MM1K_CAP)
    return f"""
WITH jobs AS (
  SELECT l_suppkey AS suppkey, CAST(COUNT(*) AS BIGINT) AS n_jobs
  FROM lineitem WHERE year(l_shipdate) = {MM1_YEAR}
  GROUP BY 1
), st AS (
  SELECT suppkey, n_jobs,
         CAST(n_jobs AS DOUBLE) / {float(MM1_DAYS)!r} AS lam,
         CAST(n_jobs AS DOUBLE) / {float(MM1_DAYS)!r} / {MM1_MU_PER_DAY!r} AS rho
  FROM jobs
), p2 AS (SELECT *, rho * rho AS r2 FROM st),
p4 AS (SELECT *, r2 * r2 AS r4 FROM p2),
p8 AS (SELECT *, r4 * r4 AS r8 FROM p4),
p10 AS (SELECT *, r8 * r2 AS r10 FROM p8),
p11 AS (SELECT *, r10 * rho AS r11 FROM p10),
fin AS (
  SELECT *,
         CASE WHEN rho = 1.0 THEN {1.0 / (MM1K_CAP + 1)!r}
              ELSE r10 * (1.0 - rho) / (1.0 - r11) END AS p_block,
         CASE WHEN rho = 1.0 THEN {k / 2.0!r}
              ELSE rho * (1.0 - {k + 1.0!r} * r10 + {k!r} * r11)
                   / ((1.0 - rho) * (1.0 - r11)) END AS l_system
  FROM p11
)
SELECT suppkey, n_jobs,
       lam AS lambda_per_day, rho, p_block, l_system,
       lam * (1.0 - p_block) AS lambda_eff_per_day
FROM fin
ORDER BY rho DESC, suppkey ASC
LIMIT {MM1K_TOP}
"""


# ---------------------------------------------------------------------------
# Laspeyres / Paasche / Fisher price indices (round 14)
# ---------------------------------------------------------------------------

PIDX_BASE_YEAR = 1995
PIDX_CURR_YEAR = 1997


def q_price_index_fisher(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classical price indices of the part basket between {y0} (base)
    and {y1} (current): Laspeyres Σp₁q₀/Σp₀q₀ (base-weighted — the CPI
    convention), Paasche Σp₁q₁/Σp₀q₁ (current-weighted), and Fisher's
    ideal index √(L·P) — the superlative compromise that passes the
    time-reversal test both one-sided indices fail. The
    macro-aggregation complement of ``price_elasticity_arc`` (which
    reads the same price-quantity co-movement per band): one number for
    "how much did this basket's price level move".

    Exactness: per (part, year), p = Σcents/Σqty is one IEEE division
    of exact integer sums, q = Σqty exact; the four basket sums Σp·q
    reduce cross-part price-quantity products — floor-quantized at
    scale 2 (cents-of-a-cent per unit: |addend| ≤ 10¹² keeps the sum
    exact to ~9·10¹³ basket-cents, far past sf100). Baskets inner-join
    parts traded in BOTH years (the standard matched-sample contract,
    documented). Degenerate contract: an empty matched basket or a zero
    base-value denominator → all indices NULL.

    Scale shape: one fact-sized hash agg to |parts|×2 cells, one
    co-partitioned self-join on partkey, one 4-sum reduce.

    Reference analog: none (engine addition, SURVEY.md §2.7)."""
    lineitem = load_table(spark, sf_dir, "lineitem")
    per_py = (
        lineitem.filter(
            F.year("l_shipdate").isin(PIDX_BASE_YEAR, PIDX_CURR_YEAR)
        )
        .groupBy(
            F.col("l_partkey").alias("partkey"),
            F.year("l_shipdate").alias("yr"),
        )
        .agg(
            F.sum(F.round(F.col("l_extendedprice") * 100, 0).cast("bigint"))
            .cast("long")
            .alias("cents"),
            F.sum(F.col("l_quantity").cast("long")).cast("long").alias("qty"),
        )
        .filter(F.col("qty") > 0)
        .select(
            "partkey",
            "yr",
            (F.col("cents").cast("double") / F.col("qty").cast("double")).alias(
                "p"
            ),
            F.col("qty").cast("double").alias("q"),
        )
    )
    base = per_py.filter(F.col("yr") == PIDX_BASE_YEAR).select(
        "partkey", F.col("p").alias("p0"), F.col("q").alias("q0")
    )
    curr = per_py.filter(F.col("yr") == PIDX_CURR_YEAR).select(
        "partkey", F.col("p").alias("p1"), F.col("q").alias("q1")
    )
    both = base.join(curr, "partkey")
    red = both.agg(
        F.count(F.lit(1)).cast("long").alias("n_parts"),
        fsum(F.col("p1") * F.col("q0"), scale=2).alias("s10"),
        fsum(F.col("p0") * F.col("q0"), scale=2).alias("s00"),
        fsum(F.col("p1") * F.col("q1"), scale=2).alias("s11"),
        fsum(F.col("p0") * F.col("q1"), scale=2).alias("s01"),
    )
    lasp = F.col("s10") / F.col("s00")
    paas = F.col("s11") / F.col("s01")
    ok = (F.col("n_parts") > 0) & (F.col("s00") > 0) & (F.col("s01") > 0)
    return red.select(
        "n_parts",
        F.when(ok, lasp).alias("laspeyres"),
        F.when(ok, paas).alias("paasche"),
        F.when(ok, F.sqrt(lasp * paas)).alias("fisher_ideal"),
    )


q_price_index_fisher.__doc__ = q_price_index_fisher.__doc__ and (
    q_price_index_fisher.__doc__.format(y0=PIDX_BASE_YEAR, y1=PIDX_CURR_YEAR)
)


def _sql_price_index() -> str:
    return f"""
WITH per_py AS (
  SELECT l_partkey AS partkey, year(l_shipdate) AS yr,
         CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS DOUBLE)
           / CAST(SUM(CAST(l_quantity AS BIGINT)) AS DOUBLE) AS p,
         CAST(SUM(CAST(l_quantity AS BIGINT)) AS DOUBLE) AS q
  FROM lineitem
  WHERE year(l_shipdate) IN ({PIDX_BASE_YEAR}, {PIDX_CURR_YEAR})
  GROUP BY 1, 2
  HAVING SUM(CAST(l_quantity AS BIGINT)) > 0
), matched AS (
  SELECT b.partkey, b.p AS p0, b.q AS q0, c.p AS p1, c.q AS q1
  FROM (SELECT * FROM per_py WHERE yr = {PIDX_BASE_YEAR}) b
  JOIN (SELECT * FROM per_py WHERE yr = {PIDX_CURR_YEAR}) c USING (partkey)
), red AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_parts,
         {sql_fsum("p1 * q0", 2)} AS s10,
         {sql_fsum("p0 * q0", 2)} AS s00,
         {sql_fsum("p1 * q1", 2)} AS s11,
         {sql_fsum("p0 * q1", 2)} AS s01
  FROM matched
)
SELECT n_parts,
       CASE WHEN n_parts > 0 AND s00 > 0 AND s01 > 0 THEN s10 / s00 END AS laspeyres,
       CASE WHEN n_parts > 0 AND s00 > 0 AND s01 > 0 THEN s11 / s01 END AS paasche,
       CASE WHEN n_parts > 0 AND s00 > 0 AND s01 > 0
            THEN SQRT((s10 / s00) * (s11 / s01)) END AS fisher_ideal
FROM red
"""


# ---------------------------------------------------------------------------
# Least-unit-cost lot sizing (round 14)
# ---------------------------------------------------------------------------


def _luc_step_snippets():
    """The least-unit-cost forward recursion as NAMED-COLUMN chain
    snippets (shared verbatim by F.expr and the oracle CTE chain) over
    the Silver-Meal cost cells c_{j}_{t} plus cumulative-demand cells
    u_{j}_{t}: extend the run while cost PER UNIT does not increase,
    decided by the exact integer cross-multiplication
    c(j,t)·u(j,t−1) ≤ c(j,t−1)·u(j,t) (operands cast to DECIMAL(19,0)
    so the product stays exact in DECIMAL(38,0) at any SF). A zero-
    demand run extends on the 0 ≤ 0 convention (covering free months
    costs nothing per unit)."""
    steps = []
    for t in range(2, WW_T + 1):

        def dec(cell_t, prev):
            return "CASE j%d %s END" % (
                prev,
                " ".join(f"WHEN {j} THEN {cell_t(j)}" for j in range(1, t)),
            )

        c_t = dec(lambda j: f"c_{j}_{t}", t - 1)
        c_p = dec(lambda j: f"c_{j}_{t - 1}", t - 1)
        u_t = dec(lambda j: f"u_{j}_{t}", t - 1)
        u_p = dec(lambda j: f"u_{j}_{t - 1}", t - 1)
        ext = (
            f"(CAST(({c_t}) AS DECIMAL(19,0)) * CAST(({u_p}) AS DECIMAL(19,0))"
            f" <= CAST(({c_p}) AS DECIMAL(19,0)) * CAST(({u_t}) AS DECIMAL(19,0)))"
        )
        steps.append(
            [
                (f"j{t}", f"CASE WHEN {ext} THEN j{t - 1} ELSE {t} END"),
                (
                    f"cost{t}",
                    f"CASE WHEN {ext} THEN cost{t - 1}"
                    f" ELSE cost{t - 1} + ({c_p}) END",
                ),
                (f"n{t}", f"CASE WHEN {ext} THEN n{t - 1} ELSE n{t - 1} + 1 END"),
            ]
        )
    final = "CASE j%d %s END" % (
        WW_T,
        " ".join(f"WHEN {j} THEN c_{j}_{WW_T}" for j in range(1, WW_T + 1)),
    )
    return steps, f"cost{WW_T} + ({final})"


def q_least_unit_cost_lot_sizing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Least-unit-cost lot-sizing heuristic on the Wagner-Whitin demand,
    setup and holding costs: extend the current order to cover the next
    period while the cost PER UNIT of the run does not increase, else
    start a new order — the third classical rung beside
    ``silver_meal_lot_sizing`` (cost per PERIOD) and the exact WW DP,
    reported with its optimality gap. SM and LUC disagree exactly when
    demand is lumpy (large periods amortize setup per unit faster than
    per period), which is why planning texts tabulate all three.

    Spark-first formulation: the WW/SM 78-cell exact-integer cost frame
    plus 78 cumulative-demand cells, then the forward recursion
    unrolled as a chain of NAMED state columns with the extend decision
    as an exact DECIMAL cross-multiplication (no unit cost is ever
    divided) — no loop, no collect, bit-exact on both engines; the
    oracle mirrors the identical snippets through a CTE chain
    (``_luc_step_snippets``).

    Scale shape: one fact-sized hash agg to 12 rows; everything after
    is literal-domain arithmetic on a 1-row frame.

    Reference analog: none (engine addition, SURVEY.md §2.7)."""
    lineitem = load_table(spark, sf_dir, "lineitem")
    monthly = (
        lineitem.filter(F.year("l_shipdate") == WW_YEAR)
        .groupBy(F.month("l_shipdate").alias("t"))
        .agg(F.sum(F.col("l_quantity").cast("long")).cast("long").alias("d"))
    )
    spine = spark.range(1, WW_T + 1).select(F.col("id").cast("int").alias("t"))
    dense = spine.join(monthly, "t", "left").select(
        "t", F.coalesce(F.col("d"), F.lit(0)).cast("long").alias("d")
    )
    aggs = [F.sum("d").cast("long").alias("total_demand_qty")]
    for j in range(1, WW_T + 1):
        for t in range(j, WW_T + 1):
            in_run = (F.col("t") >= j) & (F.col("t") <= t)
            hold = F.sum(
                F.when(
                    in_run,
                    (F.col("t") - F.lit(j)).cast("long") * F.col("d"),
                ).otherwise(F.lit(0))
            )
            aggs.append(
                (hold * F.lit(WW_HOLD_CENTS) + F.lit(WW_SETUP_CENTS))
                .cast("long")
                .alias(f"c_{j}_{t}")
            )
            aggs.append(
                F.sum(F.when(in_run, F.col("d")).otherwise(F.lit(0)))
                .cast("long")
                .alias(f"u_{j}_{t}")
            )
    state = dense.agg(*aggs)
    state = (
        state.withColumn("j1", F.lit(1))
        .withColumn("cost1", F.lit(0).cast("long"))
        .withColumn("n1", F.lit(1))
    )
    steps, final_cost = _luc_step_snippets()
    for cols in steps:
        for name, sql in cols:
            state = state.withColumn(name, F.expr(sql))
    ww = _ww_f_exprs()
    return state.select(
        F.lit(WW_T).cast("int").alias("n_periods"),
        "total_demand_qty",
        F.expr(final_cost).cast("long").alias("luc_cost_cents"),
        F.col(f"n{WW_T}").cast("int").alias("luc_n_orders"),
        ww[WW_T].cast("long").alias("ww_optimal_cost_cents"),
        (F.expr(final_cost).cast("long") - ww[WW_T].cast("long"))
        .cast("long")
        .alias("luc_gap_cents"),
    )


def _sql_least_unit_cost() -> str:
    cells = []
    for j in range(1, WW_T + 1):
        for t in range(j, WW_T + 1):
            cells.append(
                f"CAST(SUM(CASE WHEN t >= {j} AND t <= {t} THEN (t - {j}) * d ELSE 0 END)"
                f" * {WW_HOLD_CENTS} + {WW_SETUP_CENTS} AS BIGINT) AS c_{j}_{t}"
            )
            cells.append(
                f"CAST(SUM(CASE WHEN t >= {j} AND t <= {t} THEN d ELSE 0 END) AS BIGINT) AS u_{j}_{t}"
            )
    cost_cols = ", ".join(cells)
    f_sql = {0: None}
    for t in range(1, WW_T + 1):
        cands = []
        for j in range(1, t + 1):
            c = f"c_{j}_{t}"
            cands.append(c if f_sql[j - 1] is None else f"({f_sql[j - 1]} + {c})")
        e = cands[0]
        for c in cands[1:]:
            e = f"LEAST({e}, {c})"
        f_sql[t] = e
    steps, final_cost = _luc_step_snippets()
    ctes = ["s1 AS (SELECT *, 1 AS j1, CAST(0 AS BIGINT) AS cost1, 1 AS n1 FROM costs)"]
    for i, cols in enumerate(steps, start=2):
        adds = ", ".join(f"{sql} AS {name}" for name, sql in cols)
        ctes.append(f"s{i} AS (SELECT *, {adds} FROM s{i - 1})")
    chain = ",\n".join(ctes)
    return f"""
WITH monthly AS (
  SELECT month(l_shipdate) AS t, CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS d
  FROM lineitem WHERE year(l_shipdate) = {WW_YEAR}
  GROUP BY 1
), spine AS (
  SELECT CAST(UNNEST(range(1, {WW_T + 1})) AS INT) AS t
), dense AS (
  SELECT spine.t, CAST(COALESCE(monthly.d, 0) AS BIGINT) AS d
  FROM spine LEFT JOIN monthly ON spine.t = monthly.t
), costs AS (
  SELECT CAST(SUM(d) AS BIGINT) AS total_demand_qty, {cost_cols}
  FROM dense
),
{chain}
SELECT CAST({WW_T} AS INT) AS n_periods,
       total_demand_qty,
       CAST({final_cost} AS BIGINT) AS luc_cost_cents,
       CAST(n{WW_T} AS INT) AS luc_n_orders,
       CAST({f_sql[WW_T]} AS BIGINT) AS ww_optimal_cost_cents,
       CAST(({final_cost}) - ({f_sql[WW_T]}) AS BIGINT) AS luc_gap_cents
FROM s{WW_T}
"""


QUERIES = {
    "queueing_mg1_pk": q_queueing_mg1_pk,
    "queueing_mm1k_blocking": q_queueing_mm1k_blocking,
    "price_index_fisher": q_price_index_fisher,
    "least_unit_cost_lot_sizing": q_least_unit_cost_lot_sizing,
    "queueing_mmc_erlang": q_queueing_mmc_erlang,
    "inventory_ss_policy": q_inventory_ss_policy,
    "silver_meal_lot_sizing": q_silver_meal_lot_sizing,
    "inventory_base_stock": q_inventory_base_stock,
    "queueing_mm1_metrics": q_queueing_mm1_metrics,
    "wagner_whitin_lot_sizing": q_wagner_whitin_lot_sizing,
    "eoq_batch_sizing": q_eoq_batch_sizing,
    "fill_rate_curve": q_fill_rate_curve,
    "pareto_skyline_suppliers": q_pareto_skyline_suppliers,
    "newsvendor_quantile": q_newsvendor_quantile,
    "price_elasticity_arc": q_price_elasticity_arc,
    "customer_rfm_segments": q_customer_rfm_segments,
    "market_concentration_hhi": q_market_concentration_hhi,
    "revenue_yoy_growth": q_revenue_yoy_growth,
    "sla_wilson_ci": q_sla_wilson_ci,
    "top_movers_mom": q_top_movers_mom,
    "orders_backlog_timeline": q_orders_backlog_timeline,
    "backlog_aging_snapshot": q_backlog_aging_snapshot,
    "customer_migration_matrix": q_customer_migration_matrix,
    "share_of_parent": q_share_of_parent,
    "single_source_parts": q_single_source_parts,
    "xyz_demand_class": q_xyz_demand_class,
    "new_vs_returning": q_new_vs_returning,
    "reorder_interval": q_reorder_interval,
    "fiscal_445_rollup": q_fiscal_445_rollup,
    "supplier_scorecard": q_supplier_scorecard,
    "revenue_mix_shift": q_revenue_mix_shift,
    "fulfillment_percentiles": q_fulfillment_percentiles,
    "abc_pareto_class": q_abc_pareto_class,
    "abc_xyz_grid": q_abc_xyz_grid,
    "otif_rate": q_otif_rate,
    "min_cost_supplier": q_min_cost_supplier,
    "order_priority_counts": q_order_priority_counts,
    "forecast_revenue_change": q_forecast_revenue_change,
    "market_share": q_market_share,
    "product_type_profit": q_product_type_profit,
    "important_stock_value": q_important_stock_value,
    "ship_delay_priority_counts": q_ship_delay_priority_counts,
    "customer_order_distribution": q_customer_order_distribution,
    "promo_revenue": q_promo_revenue,
    "top_supplier": q_top_supplier,
    "parts_supplier_counts": q_parts_supplier_counts,
    "large_volume_customer": q_large_volume_customer,
    "discounted_revenue_disjunctive": q_discounted_revenue_disjunctive,
    "potential_part_promotion": q_potential_part_promotion,
    "waiting_suppliers": q_waiting_suppliers,
    "global_sales_opportunity": q_global_sales_opportunity,
}

ORACLE = {
    "queueing_mg1_pk": _sql_queueing_mg1(),
    "queueing_mm1k_blocking": _sql_queueing_mm1k(),
    "price_index_fisher": _sql_price_index(),
    "least_unit_cost_lot_sizing": _sql_least_unit_cost(),
    "queueing_mmc_erlang": _sql_mmc(),
    "inventory_ss_policy": _sql_ss_policy(),
    "silver_meal_lot_sizing": _sql_silver_meal(),
    "inventory_base_stock": _ORACLE_BASE_STOCK,
    "queueing_mm1_metrics": _ORACLE_MM1,
    "wagner_whitin_lot_sizing": _sql_wagner_whitin(),
    "eoq_batch_sizing": _ORACLE_EOQ,
    "fill_rate_curve": _ORACLE_FILL_RATE,
    "newsvendor_quantile": _ORACLE_NEWSVENDOR,
    "price_elasticity_arc": _ORACLE_ELASTICITY,
    "pareto_skyline_suppliers": _ORACLE_PARETO_SKYLINE,
    "customer_rfm_segments": _ORACLE_CUSTOMER_RFM_SEGMENTS,
    "market_concentration_hhi": _ORACLE_HHI,
    "revenue_yoy_growth": _ORACLE_YOY,
    "sla_wilson_ci": _ORACLE_WILSON,
    "top_movers_mom": _ORACLE_MOVERS,
    "orders_backlog_timeline": _ORACLE_BACKLOG,
    "backlog_aging_snapshot": _sql_backlog_aging(),
    "customer_migration_matrix": _ORACLE_MIGRATION,
    "share_of_parent": _ORACLE_SHARE_OF_PARENT,
    "single_source_parts": _ORACLE_SINGLE_SOURCE,
    "xyz_demand_class": _ORACLE_XYZ,
    "new_vs_returning": _ORACLE_NEW_VS_RETURNING,
    "reorder_interval": _ORACLE_REORDER,
    "fiscal_445_rollup": _sql_fiscal_445(),
    "supplier_scorecard": _ORACLE_SUPPLIER_SCORECARD,
    "revenue_mix_shift": _ORACLE_REVENUE_MIX_SHIFT,
    "fulfillment_percentiles": _ORACLE_FULFILLMENT_PERCENTILES,
    "abc_pareto_class": _ORACLE_ABC_PARETO_CLASS,
    "abc_xyz_grid": _ORACLE_ABC_XYZ_GRID,
    "otif_rate": _ORACLE_OTIF,
    "min_cost_supplier": _ORACLE_MIN_COST_SUPPLIER,
    "order_priority_counts": _ORACLE_ORDER_PRIORITY_COUNTS,
    "forecast_revenue_change": _ORACLE_FORECAST_REVENUE_CHANGE,
    "market_share": _ORACLE_MARKET_SHARE,
    "product_type_profit": _ORACLE_PRODUCT_TYPE_PROFIT,
    "important_stock_value": _ORACLE_IMPORTANT_STOCK_VALUE,
    "ship_delay_priority_counts": _ORACLE_SHIP_DELAY_PRIORITY_COUNTS,
    "customer_order_distribution": _ORACLE_CUSTOMER_ORDER_DISTRIBUTION,
    "promo_revenue": _ORACLE_PROMO_REVENUE,
    "top_supplier": _ORACLE_TOP_SUPPLIER,
    "parts_supplier_counts": _ORACLE_PARTS_SUPPLIER_COUNTS,
    "large_volume_customer": _ORACLE_LARGE_VOLUME_CUSTOMER,
    "discounted_revenue_disjunctive": _ORACLE_DISCOUNTED_REVENUE_DISJUNCTIVE,
    "potential_part_promotion": _ORACLE_POTENTIAL_PART_PROMOTION,
    "waiting_suppliers": _ORACLE_WAITING_SUPPLIERS,
    "global_sales_opportunity": _ORACLE_GLOBAL_SALES_OPPORTUNITY,
}
