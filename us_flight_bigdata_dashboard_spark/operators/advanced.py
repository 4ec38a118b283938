"""Idiomatic-Spark upgrades beyond the reference's surface (SURVEY.md §7
item 6): semi/anti joins, CUBE grouping sets, exact interpolated
percentiles, and a skew-resistant salted aggregation.

The salted aggregation is the canonical 100 TB skew defense: pre-aggregate
on (keys, salt) so one hot key fans out over N reducers, then merge the
additive partials. Results are provably identical to the direct groupBy —
the oracle for it IS the plain GROUP BY.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from us_flight_bigdata_dashboard_spark.functions.exact import davg, dsum, sql_davg, sql_dsum
from us_flight_bigdata_dashboard_spark.operators.statistics import _cum_prev
from us_flight_bigdata_dashboard_spark.sources.catalog import load_table

N_SALT = 16


def q_semi_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT SEMI + LEFT ANTI joins: per market segment, customers with ≥1
    open-priority order vs customers with none. Semi/anti never widen rows
    — at scale they shuffle only the join keys."""
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_orderpriority") == "1-URGENT")
    with_urgent = (
        customer.join(orders, customer.c_custkey == orders.o_custkey, "left_semi")
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n_with_urgent"))
    )
    without_urgent = (
        customer.join(orders, customer.c_custkey == orders.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n_without_urgent"))
    )
    return with_urgent.join(without_urgent, "c_mktsegment", "outer").na.fill(0)


_ORACLE_SEMI_ANTI = """
SELECT c_mktsegment,
       CAST(COALESCE(SUM(CASE WHEN has_urgent THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_with_urgent,
       CAST(COALESCE(SUM(CASE WHEN has_urgent THEN 0 ELSE 1 END), 0) AS BIGINT) AS n_without_urgent
FROM (
  SELECT c_mktsegment,
         EXISTS (SELECT 1 FROM orders
                 WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT') AS has_urgent
  FROM customer
)
GROUP BY 1
"""


def q_grouping_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP BY CUBE over (returnflag, linestatus) — all 4 grouping sets in
    one pass (generalizes the reference's manual rollup A10)."""
    lineitem = load_table(spark, sf_dir, "lineitem")
    return lineitem.cube("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("n_rows"),
        dsum("l_quantity").alias("sum_qty"),
    )


_ORACLE_GROUPING_CUBE = f"""
SELECT l_returnflag, l_linestatus,
       COUNT(*) AS n_rows,
       {sql_dsum("l_quantity")} AS sum_qty
FROM lineitem
GROUP BY CUBE(1, 2)
"""


def q_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles per group (median + p90 of order
    totals). Spark ``percentile`` and DuckDB ``quantile_cont`` share the
    linear-interpolation definition; operands are identical so results
    match bit-for-bit. (``approx_percentile`` is the at-scale variant —
    sketch-based, engine-specific, deliberately not in the exact gate.)"""
    orders = load_table(spark, sf_dir, "orders")
    return orders.groupBy("o_orderpriority").agg(
        F.expr("percentile(o_totalprice, 0.5)").alias("median_price"),
        F.expr("percentile(o_totalprice, 0.9)").alias("p90_price"),
        F.count(F.lit(1)).alias("n_orders"),
    )


_ORACLE_PERCENTILES = """
SELECT o_orderpriority,
       quantile_cont(o_totalprice, 0.5) AS median_price,
       quantile_cont(o_totalprice, 0.9) AS p90_price,
       COUNT(*) AS n_orders
FROM orders
GROUP BY 1
"""


def salted_agg_sum(
    df: DataFrame, keys: list[str], value: Column, alias: str, n_salt: int = N_SALT
) -> DataFrame:
    """Explicit two-phase (keys, salt) partial → keys final aggregation.

    Honest scope note: for plain additive aggregates Spark's map-side
    partial HashAggregate ALREADY bounds reducer input to one row per key
    per map partition, so this rewrite is a demonstration of the pattern,
    not a needed defense here. The pattern earns its keep where partials
    don't combine map-side — exact count-distinct on a hot key, collect-
    style aggregates, or the build side of a skewed join (where the salt
    must also be replicated on the other side). Any salt assignment yields
    the same result because the aggregate is additive (verified invariant
    under different partition counts; the oracle is the plain GROUP BY).

    Quantization bound: the second dsum re-quantizes partial sums at
    scale=4, exact while |partial|·10^4 < 2^53 (≈9·10^11 per partial) —
    far above these metrics; raise the inner scale for larger magnitudes.
    """
    salted = df.withColumn("_salt", F.spark_partition_id() % n_salt)
    partial = salted.groupBy(*keys, "_salt").agg(
        F.count(F.lit(1)).alias("_n"), dsum(value).alias("_s")
    )
    return partial.groupBy(*keys).agg(
        F.sum("_n").alias("n_rows"), dsum(F.col("_s")).alias(alias)
    )


def q_skew_salted_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted aggregation over a deliberately skewed key (returnflag has ~3
    values — a hot-key shape). Oracle = the plain GROUP BY, proving the
    rewrite is semantics-preserving."""
    lineitem = load_table(spark, sf_dir, "lineitem")
    return salted_agg_sum(lineitem, ["l_returnflag"], F.col("l_extendedprice"), "sum_price")


_ORACLE_SKEW_SALTED = f"""
SELECT l_returnflag,
       COUNT(*) AS n_rows,
       {sql_dsum("l_extendedprice")} AS sum_price
FROM lineitem
GROUP BY 1
"""


WINSOR_LO, WINSOR_HI = 0.05, 0.95


def q_winsorize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorization: clip each group's values to its own [p5, p95] band —
    the standard outlier-capping step before computing means that a single
    fat-finger value would otherwise drag (and, in a feature pipeline, the
    robust-scaling pre-step). Reference analog: none (extension scope).

    Two-pass shape like the z-score gate: pass 1 computes per-group exact
    interpolated percentiles (Spark ``percentile`` ≡ DuckDB
    ``quantile_cont``, bit-identical — the `percentiles` entry proves it);
    the tiny bounds table broadcasts back onto the scan and the clip is a
    narrow ``least/greatest``. Means of clipped values are decimal-exact
    (``davg``). At 100 TB swap pass 1 to ``approx_percentile`` (the
    bounds-gated `approx_percentile` entry covers the sketch's error).
    """
    orders = load_table(spark, sf_dir, "orders")
    bounds = orders.groupBy("o_orderpriority").agg(
        F.expr(f"percentile(o_totalprice, {WINSOR_LO})").alias("_lo"),
        F.expr(f"percentile(o_totalprice, {WINSOR_HI})").alias("_hi"),
    )
    clipped = orders.join(F.broadcast(bounds), "o_orderpriority").withColumn(
        "_clipped", F.least(F.greatest(F.col("o_totalprice"), F.col("_lo")), F.col("_hi"))
    )
    return clipped.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(F.when(F.col("o_totalprice") != F.col("_clipped"), 1).otherwise(0)).alias(
            "n_clipped"
        ),
        davg("o_totalprice").alias("raw_mean"),
        davg("_clipped").alias("winsor_mean"),
    )


_ORACLE_WINSORIZE = f"""
WITH bounds AS (
  SELECT o_orderpriority,
         quantile_cont(o_totalprice, {WINSOR_LO}) AS _lo,
         quantile_cont(o_totalprice, {WINSOR_HI}) AS _hi
  FROM orders GROUP BY 1
),
clipped AS (
  SELECT o.o_orderpriority, o.o_totalprice,
         least(greatest(o.o_totalprice, b._lo), b._hi) AS _clipped
  FROM orders o JOIN bounds b USING (o_orderpriority)
)
SELECT o_orderpriority,
       COUNT(*) AS n_orders,
       CAST(SUM(CASE WHEN o_totalprice <> _clipped THEN 1 ELSE 0 END) AS BIGINT) AS n_clipped,
       {sql_davg("o_totalprice")} AS raw_mean,
       {sql_davg("_clipped")} AS winsor_mean
FROM clipped
GROUP BY 1
"""


def q_skew_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted join: the skew defense for a join whose key distribution has
    hot values — replicate the small side N_SALT times with a salt column,
    salt the big side deterministically, and join on (key, salt) so each
    hot key's rows spread across N_SALT reducers instead of one straggler.

    Honest scope note (mirrors ``salted_agg_sum``): supplier is
    dimension-sized here, so in production THIS join would simply
    broadcast; the salt pattern earns its keep when both sides are too big
    to broadcast and AQE's skew-join split (which handles the probe side
    only) can't fix a build-side hot key. The salt is ``l_orderkey %
    N_SALT`` — deterministic, so the oracle (the plain join) proves the
    rewrite is semantics-preserving; any salt assignment gives the same
    result because the join key is replicated on every salt value.

    Scale shape: replication multiplies the SMALL side by N_SALT (bounded,
    build-side); the big side gains one narrow column. The final
    aggregation re-reduces to |nation| rows.
    """
    lineitem = load_table(spark, sf_dir, "lineitem")
    supplier = load_table(spark, sf_dir, "supplier")
    salted_dim = supplier.select(
        "s_suppkey", "s_nationkey", F.explode(F.sequence(F.lit(0), F.lit(N_SALT - 1))).alias("_salt")
    )
    salted_fact = lineitem.select(
        "l_suppkey", "l_extendedprice", (F.col("l_orderkey") % N_SALT).cast("int").alias("_salt")
    )
    joined = salted_fact.join(
        salted_dim,
        (salted_fact["l_suppkey"] == salted_dim["s_suppkey"])
        & (salted_fact["_salt"] == salted_dim["_salt"]),
    )
    return joined.groupBy("s_nationkey").agg(
        F.count(F.lit(1)).alias("n_items"),
        dsum("l_extendedprice").alias("sum_price"),
    )


_ORACLE_SKEW_SALTED_JOIN = f"""
SELECT s_nationkey,
       COUNT(*) AS n_items,
       {sql_dsum("l_extendedprice")} AS sum_price
FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
GROUP BY 1
"""


# ---------------------------------------------------------------------------
# Approximate aggregates under a bounds-checked gate
# ---------------------------------------------------------------------------
#
# Sketch results (HLL++, KLL-style quantile digest) are engine-specific, so
# they can't be hash-matched against DuckDB. The gate instead *encodes the
# sketch's documented error bound as a result column*: the Spark query
# computes both the exact value and the sketch value and returns
# `approx_within_bounds`; the oracle returns the exact value and TRUE. The
# driver's hash compare then (a) exact-matches the exact columns and (b)
# fails if the sketch ever strays outside its bound — a tolerance oracle
# expressed through the exact-match gate.

HLL_RSD = 0.02          # HLL++ target relative standard deviation
HLL_BOUND = 5 * HLL_RSD  # pass band: 5 standard errors (P[miss] ≈ 6e-7)
PCTL_ACCURACY = 10_000   # approx_percentile rank error ≤ 1/accuracy = 1e-4
PCTL_EPS = 0.02          # pass band: ±0.02 quantile rank (200× the error)


def q_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`approx_count_distinct` (HyperLogLog++) next to the exact distinct
    count — the at-scale variant of A11/exact countDistinct (SURVEY.md §7
    item 6): HLL merges additively with no expand, so at 100 TB it replaces
    the exact count wherever ±2% is acceptable. The exact column is
    hash-gated; the sketch is gated to |approx − exact| ≤ 5·rsd·exact."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.countDistinct("o_custkey").alias("exact_customers"),
            F.approx_count_distinct("o_custkey", rsd=HLL_RSD).alias("_approx"),
        )
        .select(
            "o_orderpriority",
            "n_orders",
            "exact_customers",
            (
                F.abs(F.col("_approx") - F.col("exact_customers"))
                <= F.col("exact_customers") * F.lit(HLL_BOUND)
            ).alias("approx_within_bounds"),
        )
    )


_ORACLE_APPROX_DISTINCT = """
SELECT o_orderpriority,
       COUNT(*) AS n_orders,
       COUNT(DISTINCT o_custkey) AS exact_customers,
       TRUE AS approx_within_bounds
FROM orders
GROUP BY 1
"""


HH_SUPPORT = 0.15  # an item is a heavy hitter when share-of-rows > this


def q_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heavy hitters by sketch-then-verify: a Misra–Gries candidate pass
    (``stat.freqItems`` — one narrow scan, ≤1/support counters per
    partition, merged on the driver) proposes candidates, then an exact
    count over ONLY candidate rows keeps those with share >
    ``HH_SUPPORT``.

    The output is DETERMINISTIC despite the sketch: Misra–Gries
    guarantees no false negatives above the support (every true heavy
    hitter is a candidate, regardless of partition order), and the exact
    verify discards the sketch's partition-order-dependent false
    positives — so the result equals a plain GROUP-BY-HAVING (the
    oracle) bit-for-bit, which is why this sits in the exact hash gate
    and not the bounds gate above. At 100 TB this replaces a full
    groupBy over a high-cardinality key: the verify agg's hash table
    holds ≤1/support keys (the IN-filter prunes at the scan), where the
    naive plan shuffles every distinct key. The strict ``>`` matches the
    sketch's guarantee boundary."""
    events = load_table(spark, sf_dir, "events")
    n_total = events.count()
    cands = events.stat.freqItems(["event_type"], support=HH_SUPPORT).collect()[0][0]
    return (
        events.filter(F.col("event_type").isin(list(cands)))
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .filter(F.col("n_events") > F.lit(n_total) * F.lit(HH_SUPPORT))
        .select(
            "event_type",
            "n_events",
            (F.col("n_events").cast("double") / F.lit(n_total)).alias("share"),
        )
    )


_ORACLE_HEAVY_HITTERS = f"""
SELECT event_type,
       COUNT(*) AS n_events,
       CAST(COUNT(*) AS DOUBLE) / (SELECT COUNT(*) FROM events) AS share
FROM events
GROUP BY 1
HAVING COUNT(*) > (SELECT COUNT(*) FROM events) * {HH_SUPPORT}
"""


def q_approx_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`approx_percentile` (quantile digest) next to the exact interpolated
    median. The sketch guarantees rank error ≤ 1/accuracy = 1e-4; the gate
    checks the sketch value lies between the exact quantiles at ±PCTL_EPS
    rank (monotonicity of the quantile function makes that band valid for
    any rank error ≤ PCTL_EPS). Exact median is hash-gated as usual."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.groupBy("o_orderpriority")
        .agg(
            F.expr("percentile(o_totalprice, 0.5)").alias("median_exact"),
            F.expr(f"percentile(o_totalprice, {0.5 - PCTL_EPS})").alias("_lo"),
            F.expr(f"percentile(o_totalprice, {0.5 + PCTL_EPS})").alias("_hi"),
            F.expr(f"approx_percentile(o_totalprice, 0.5, {PCTL_ACCURACY})").alias("_approx"),
            F.count(F.lit(1)).alias("n_orders"),
        )
        .select(
            "o_orderpriority",
            "median_exact",
            "n_orders",
            ((F.col("_approx") >= F.col("_lo")) & (F.col("_approx") <= F.col("_hi"))).alias(
                "approx_within_bounds"
            ),
        )
    )


_ORACLE_APPROX_PERCENTILE = """
SELECT o_orderpriority,
       quantile_cont(o_totalprice, 0.5) AS median_exact,
       COUNT(*) AS n_orders,
       TRUE AS approx_within_bounds
FROM orders
GROUP BY 1
"""


HIST_LO = 0.0
HIST_STEP = 50_000.0
HIST_NBINS = 12


def q_histogram_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width histogram over order value (the profiling primitive every
    dashboard needs; the reference bins client-side in Plotly —
    `src/app.py` histogram traces — which cannot work at 100 TB; binning
    must happen in the engine and ship only ``nbins`` rows).

    One narrow projection (`width_bucket`-style floor arithmetic, clamped
    to the edge bins) + one hash agg keyed on the bin — map-side combine
    reduces every partition to ≤ nbins partials, so the shuffle is bytes,
    not rows. The oracle states the identical floor expression; a single
    double subtract/divide/floor is exactly rounded, hence bit-stable
    across engines."""
    orders = load_table(spark, sf_dir, "orders")
    raw_bin = F.floor((F.col("o_totalprice") - F.lit(HIST_LO)) / F.lit(HIST_STEP))
    bin_ = F.least(F.greatest(raw_bin, F.lit(0)), F.lit(HIST_NBINS - 1)).cast("int")
    return (
        orders.select(bin_.alias("bin"), "o_totalprice")
        .groupBy("bin")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            dsum("o_totalprice").alias("sum_price"),
            F.min("o_totalprice").alias("min_price"),
            F.max("o_totalprice").alias("max_price"),
        )
        .withColumn("bin_lo", (F.lit(HIST_LO) + F.col("bin") * F.lit(HIST_STEP)))
        .withColumn("bin_hi", (F.lit(HIST_LO) + (F.col("bin") + 1) * F.lit(HIST_STEP)))
    )


_ORACLE_HISTOGRAM_PRICE = f"""
SELECT bin,
       COUNT(*) AS n_orders,
       {sql_dsum("o_totalprice")} AS sum_price,
       MIN(o_totalprice) AS min_price,
       MAX(o_totalprice) AS max_price,
       CAST({HIST_LO} + bin * {HIST_STEP} AS DOUBLE) AS bin_lo,
       CAST({HIST_LO} + (bin + 1) * {HIST_STEP} AS DOUBLE) AS bin_hi
FROM (
  SELECT CAST(least(greatest(floor((o_totalprice - {HIST_LO}) / {HIST_STEP}), 0), {HIST_NBINS - 1}) AS INTEGER) AS bin,
         o_totalprice
  FROM orders
)
GROUP BY bin
"""


def q_grouping_sets_explicit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arbitrary GROUPING SETS — not the rollup/cube lattices (already
    covered) but a hand-picked set list ((priority, status), (priority),
    (status)) with ``grouping_id`` disambiguating which set produced each
    row (the NULL-vs-grouped ambiguity every BI layer must resolve).
    One expand + one hash agg; expand multiplies rows by the set count
    before the map-side combine, so partials stay bytes at scale."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.groupingSets(
            [["o_orderpriority", "o_orderstatus"], ["o_orderpriority"], ["o_orderstatus"]],
            "o_orderpriority",
            "o_orderstatus",
        )
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            dsum("o_totalprice").alias("sum_price"),
            F.grouping_id().alias("gid"),
        )
    )


_ORACLE_GROUPING_SETS_EXPLICIT = f"""
SELECT o_orderpriority, o_orderstatus,
       COUNT(*) AS n_orders,
       {sql_dsum("o_totalprice")} AS sum_price,
       GROUPING(o_orderpriority, o_orderstatus) AS gid
FROM orders
GROUP BY GROUPING SETS ((o_orderpriority, o_orderstatus), (o_orderpriority), (o_orderstatus))
"""


def q_window_first_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FIRST_VALUE / LAST_VALUE / NTH_VALUE over an explicit full-partition
    frame (the default frame stops at CURRENT ROW — the classic
    last_value trap; both engines get the same explicit frame so the
    semantics are unambiguous). One keyed window shuffle.

    Scale note: the priority key is low-cardinality, and full-frame
    first/last/nth has no rank filter for Catalyst's WindowGroupLimit to
    prune with — at 100 TB compute the per-group (first, last, nth)
    triples as a tiny aggregate and broadcast-join them back, or use the
    bucketed global-rank pattern (hash-range buckets + offset table) that
    ``sampling.q_token_budget_fill`` demonstrates."""
    orders = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_orderpriority")
        .orderBy(F.col("o_orderdate").asc(), F.col("o_orderkey").asc())
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return orders.select(
        "o_orderkey",
        "o_orderpriority",
        F.first_value("o_orderkey").over(w).alias("first_key"),
        F.last_value("o_orderkey").over(w).alias("last_key"),
        F.nth_value("o_orderkey", 2).over(w).alias("second_key"),
    )


_ORACLE_WINDOW_FIRST_LAST = """
SELECT o_orderkey, o_orderpriority,
       FIRST_VALUE(o_orderkey) OVER w AS first_key,
       LAST_VALUE(o_orderkey) OVER w AS last_key,
       NTH_VALUE(o_orderkey, 2) OVER w AS second_key
FROM orders
WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_orderdate ASC, o_orderkey ASC
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
"""


def q_skew_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-key skew profiling: the measurement that decides between a
    plain shuffle join, broadcast, salting, or AQE skew handling. Per-key
    row counts reduce to global skew statistics — distinct keys, max and
    mean rows per key, the skew ratio max/mean, and the heaviest key
    (deterministic: rank by count desc then key asc, never ``max_by`` with
    its undefined tie behavior).

    Two aggs: per-key (map-side combined, key-cardinality output) then a
    single-row reduce — the profile costs one scan + one key shuffle of
    counts, so it is cheap enough to run ahead of every large production
    join."""
    lineitem = load_table(spark, sf_dir, "lineitem")
    per_key = lineitem.groupBy("l_suppkey").agg(F.count(F.lit(1)).alias("n"))
    ranked = _cum_prev(
        per_key.withColumn("_negn", -F.col("n")),
        ["_negn", "l_suppkey"],
        {"_rp": F.lit(1)},
        materialize=True,
    ).withColumn("rk", F.col("_rp") + F.lit(1))
    return ranked.agg(
        F.count(F.lit(1)).alias("n_keys"),
        F.sum("n").alias("n_rows"),
        F.max("n").alias("max_rows_per_key"),
        (F.sum("n").cast("double") / F.count(F.lit(1))).alias("mean_rows_per_key"),
        (
            F.max("n").cast("double") / (F.sum("n").cast("double") / F.count(F.lit(1)))
        ).alias("skew_ratio"),
        F.min(F.when(F.col("rk") == 1, F.col("l_suppkey"))).alias("heaviest_key"),
    )


_ORACLE_SKEW_PROFILE = """
WITH per_key AS (
  SELECT l_suppkey, COUNT(*) AS n FROM lineitem GROUP BY 1
), ranked AS (
  SELECT *, ROW_NUMBER() OVER (ORDER BY n DESC, l_suppkey ASC) AS rk FROM per_key
)
SELECT COUNT(*) AS n_keys,
       CAST(SUM(n) AS BIGINT) AS n_rows,
       MAX(n) AS max_rows_per_key,
       CAST(SUM(n) AS DOUBLE) / COUNT(*) AS mean_rows_per_key,
       CAST(MAX(n) AS DOUBLE) / (CAST(SUM(n) AS DOUBLE) / COUNT(*)) AS skew_ratio,
       MIN(CASE WHEN rk = 1 THEN l_suppkey END) AS heaviest_key
FROM ranked
"""



N_EQUIFREQ_BINS = 10


def q_histogram_equifreq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equal-frequency (quantile) binning of order totals: NTILE assigns
    each row to one of N_EQUIFREQ_BINS equally-populated bins, then per-bin
    count and [min, max] edges — the discretization a feature pipeline or
    optimizer histogram uses when equal-WIDTH bins (`histogram_price`)
    would put 90% of mass in two buckets. Total order (price, orderkey)
    makes the tile assignment deterministic for the oracle.

    Scale note: the exact NTILE comes from the ``_cum_prev`` bucketed
    global rank in closed form (r14 optimization — no one-partition
    window sort; the plain-NTILE oracle proves value-identity).
    """
    orders = load_table(spark, sf_dir, "orders").select(
        "o_totalprice", "o_orderkey"
    )
    # exact NTILE from the _cum_prev bucketed global rank (r14
    # optimization — no single-task total sort): q = n DIV k, r = n MOD k,
    # first r tiles hold q+1 rows — the NTILE definition of both engines.
    # n comes from the decomposition's own offset table (with_totals, r15
    # optimization) instead of a separate full-scan count aggregation.
    n = F.col("_rp_tot")
    rn = F.col("_rp") + F.lit(1)
    q = F.floor(n / F.lit(N_EQUIFREQ_BINS)).cast("long")
    r = n % F.lit(N_EQUIFREQ_BINS)
    big = r * (q + F.lit(1))
    ntile = (
        F.when(rn <= big, F.floor((rn - 1) / (q + F.lit(1))))
        .otherwise(r + F.floor((rn - big - F.lit(1)) / q))
        + F.lit(1)
    ).cast("int")
    binned = _cum_prev(
        orders, ["o_totalprice", "o_orderkey"], {"_rp": F.lit(1)}, with_totals=True
    ).select("o_totalprice", ntile.alias("bin_id"))
    return binned.groupBy("bin_id").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.min("o_totalprice").alias("bin_lo"),
        F.max("o_totalprice").alias("bin_hi"),
    )


_ORACLE_HISTOGRAM_EQUIFREQ = f"""
SELECT bin_id, COUNT(*) AS n_orders,
       MIN(o_totalprice) AS bin_lo, MAX(o_totalprice) AS bin_hi
FROM (
  SELECT o_totalprice,
         NTILE({N_EQUIFREQ_BINS}) OVER (ORDER BY o_totalprice ASC, o_orderkey ASC) AS bin_id
  FROM orders
)
GROUP BY bin_id
"""


# ---------------------------------------------------------------------------
# Relational division (for-all quantification)
# ---------------------------------------------------------------------------

DIVISION_YEAR = 1995


def q_relational_division(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Relational DIVISION — the "for all" quantifier SQL lacks natively:
    customers who placed an order in EVERY quarter of {y} (÷ the 4-quarter
    divisor set). Textbook renderings are a double NOT EXISTS; the
    engine-friendly form used here is the count-matching reduction:
    distinct (customer, month) pairs, then keep customers whose distinct
    month count equals the divisor cardinality — one hash agg instead of
    two correlated anti joins (identical semantics because the pair set
    is deduplicated first; the oracle keeps the same shape).

    Output: the qualifying customers with their {y} order counts and
    exact revenue cents (so a wrong division result shifts every
    column). Scale shape: scan → (cust, month) distinct collapse →
    per-customer hash agg → division filter; all map-side combinable,
    no correlated subqueries, no join at all until the final
    broadcast-sized name lookup.
    """
    orders = load_table(spark, sf_dir, "orders").filter(
        F.year("o_orderdate") == DIVISION_YEAR
    )
    per_c = orders.groupBy("o_custkey").agg(
        F.countDistinct(F.quarter("o_orderdate")).alias("quarters_active"),
        F.count(F.lit(1)).cast("long").alias("n_orders"),
        F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("bigint"))
        .cast("long")
        .alias("revenue_cents"),
    )
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    return (
        per_c.filter(F.col("quarters_active") == 4)
        .join(F.broadcast(cust), per_c.o_custkey == cust.c_custkey)
        .select(
            "c_custkey",
            "c_name",
            "n_orders",
            "revenue_cents",
        )
        .orderBy("c_custkey")
    )
q_relational_division.__doc__ = q_relational_division.__doc__ and q_relational_division.__doc__.format(y=DIVISION_YEAR)


_ORACLE_DIVISION = f"""
WITH per_c AS (
  SELECT o_custkey,
         COUNT(DISTINCT QUARTER(o_orderdate)) AS quarters_active,
         CAST(COUNT(*) AS BIGINT) AS n_orders,
         CAST(SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT)
           AS revenue_cents
  FROM orders
  WHERE YEAR(o_orderdate) = {DIVISION_YEAR}
  GROUP BY 1
)
SELECT c_custkey, c_name, n_orders, revenue_cents
FROM per_c JOIN customer ON o_custkey = c_custkey
WHERE quarters_active = 4
ORDER BY c_custkey
"""


QUERIES = {
    "semi_anti_join": q_semi_anti_join,
    "relational_division": q_relational_division,
    "histogram_price": q_histogram_price,
    "grouping_sets_explicit": q_grouping_sets_explicit,
    "window_first_last": q_window_first_last,
    "skew_profile": q_skew_profile,
    "grouping_cube": q_grouping_cube,
    "percentiles": q_percentiles,
    "skew_salted_agg": q_skew_salted_agg,
    "skew_salted_join": q_skew_salted_join,
    "winsorize_clip": q_winsorize,
    "histogram_equifreq": q_histogram_equifreq,
    "approx_distinct": q_approx_distinct,
    "approx_percentile": q_approx_percentile,
    "heavy_hitters": q_heavy_hitters,
}

ORACLE = {
    "semi_anti_join": _ORACLE_SEMI_ANTI,
    "relational_division": _ORACLE_DIVISION,
    "histogram_price": _ORACLE_HISTOGRAM_PRICE,
    "grouping_sets_explicit": _ORACLE_GROUPING_SETS_EXPLICIT,
    "window_first_last": _ORACLE_WINDOW_FIRST_LAST,
    "skew_profile": _ORACLE_SKEW_PROFILE,
    "grouping_cube": _ORACLE_GROUPING_CUBE,
    "percentiles": _ORACLE_PERCENTILES,
    "skew_salted_agg": _ORACLE_SKEW_SALTED,
    "skew_salted_join": _ORACLE_SKEW_SALTED_JOIN,
    "winsorize_clip": _ORACLE_WINSORIZE,
    "histogram_equifreq": _ORACLE_HISTOGRAM_EQUIFREQ,
    "approx_distinct": _ORACLE_APPROX_DISTINCT,
    "approx_percentile": _ORACLE_APPROX_PERCENTILE,
    "heavy_hitters": _ORACLE_HEAVY_HITTERS,
}
