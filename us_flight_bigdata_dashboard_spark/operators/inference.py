"""Classical inference operators (round 8): one-way ANOVA, Brown–Forsythe
variance homogeneity, Cramér's V effect size, and the A/B sample-ratio-
mismatch guard.

These complete the experimentation toolkit next to ``statistics.py``'s
two-sample tests (Welch t, KS, Mann–Whitney) with the k-GROUP rungs: does
a metric differ across MANY segments at once (ANOVA), is the equal-
variance assumption behind pooled tests even true (Brown–Forsythe — the
robust Levene variant), how STRONG is a categorical association beyond
its χ² significance (Cramér's V), and is the experiment's hash split
itself healthy (SRM — the first thing a trustworthy A/B platform checks;
Fabijan et al. 2019 report it fires in ~6% of real experiments).

Determinism (the house rules of ``statistics.py``): every data-sized
aggregate is an exact decimal/integer moment; cross-group float
reductions run over LITERAL group domains as fixed-order expression sums
(partition-order-free; see the note at ``_FLAGS`` for why the
floor-quantization trick does not survive these magnitudes), except the
contingency-cell sum of ``cramers_v`` whose small terms keep the
``chi_square_assoc`` floor-trick; ``sqrt`` is the one
allowlisted irrational (correctly-rounded IEEE on both engines); no ln,
no pow, no CDFs — significance is expressed through RATIONAL threshold
comparisons on literal critical values, which is exactly how a serving
layer consumes these statistics anyway.

Scale shape: each entry is ONE map-side-combinable hash aggregate over
the fact table (plus, for Brown–Forsythe, one keyed window for the group
medians); everything after is arithmetic on ≤ |groups| rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from us_flight_bigdata_dashboard_spark.functions.exact import (
    dec_to_double,
    sql_dec_to_double,
)
from us_flight_bigdata_dashboard_spark.operators.dedup import _sql_hex_to_int
from us_flight_bigdata_dashboard_spark.operators.statistics import _cum_prev
from us_flight_bigdata_dashboard_spark.sources.catalog import load_table

# The three return flags — the literal group domain both ANOVA entries
# reduce over. A LITERAL domain is what makes the cross-group float
# reduction deterministic: the k per-group terms are extracted as named
# conditional aggregates and added in ONE FIXED left-to-right expression,
# so both engines execute the identical IEEE op sequence. The metric is
# the INTEGER l_quantity (≤ 50): every moment stays inside the exact-
# double window to sf100 and beyond. Two failed variants bought this
# design: dsum(cents, scale=2) lost one ulp to the Spark-HALF_UP vs
# DuckDB-half-even double→DECIMAL cast, and integer CENTS² sums crossed
# 2^53 where DuckDB's wide-DECIMAL→double cast is not correctly rounded.
_FLAGS = ["A", "N", "R"]


def _f_stat_from_group_moments(m: DataFrame, group_col: str) -> DataFrame:
    """(group, n, s, ss) → one row of ANOVA pieces. ``s`` is the exact
    decimal group sum (cents-exact, < 2^53 so its double is exact), ``ss``
    the exact decimal sum of squares (one correctly-rounded final cast).
    Cross-group terms are reduced in literal-domain order — a fixed IEEE
    op sequence, identical on both engines."""
    g = F.col(group_col)
    nd = F.col("n").cast("double")
    between_g = F.col("s") * F.col("s") / nd  # S_g²/n_g
    within_g = F.col("ss") - between_g  # SS_g − S_g²/n_g
    aggs = [
        F.count(F.lit(1)).alias("k"),
        F.sum("n").alias("n_rows"),
        F.sum(F.col("s").cast("decimal(38,0)")).cast("double").alias("grand_s"),
    ]
    for i, p in enumerate(_FLAGS):
        aggs.append(F.max(F.when(g == p, between_g)).alias(f"b{i}"))
        aggs.append(F.max(F.when(g == p, within_g)).alias(f"w{i}"))
    red = m.agg(*aggs)
    b_raw = F.col("b0") + F.col("b1") + F.col("b2")
    ssw = F.col("w0") + F.col("w1") + F.col("w2")
    nall = F.col("n_rows").cast("double")
    ssb = b_raw - F.col("grand_s") * F.col("grand_s") / nall
    kd = F.col("k").cast("double")
    return red.select(
        "k",
        "n_rows",
        ssb.alias("ss_between"),
        ssw.alias("ss_within"),
        ((ssb / (kd - F.lit(1.0))) / (ssw / (nall - kd))).alias("f_stat"),
        (ssb / (ssb + ssw)).alias("eta_sq"),
    )


def _sql_f_from_moments(moments_cte: str, group_col: str) -> str:
    """SQL mirror of ``_f_stat_from_group_moments`` over a CTE named ``m``
    with columns (group, n, s, ss)."""
    b_terms = []
    w_terms = []
    sel = []
    for i, p in enumerate(_FLAGS):
        sel.append(
            f"MAX(CASE WHEN {group_col} = '{p}' THEN s * s / CAST(n AS DOUBLE) END) AS b{i}"
        )
        sel.append(
            f"MAX(CASE WHEN {group_col} = '{p}' THEN ss - s * s / CAST(n AS DOUBLE) END) AS w{i}"
        )
        b_terms.append(f"b{i}")
        w_terms.append(f"w{i}")
    b_raw = " + ".join(b_terms)
    ssw = " + ".join(w_terms)
    return f"""
{moments_cte}, red AS (
  SELECT COUNT(*) AS k,
         CAST(SUM(n) AS BIGINT) AS n_rows,
         CAST(SUM(CAST(s AS DECIMAL(38,0))) AS DOUBLE) AS grand_s,
         {", ".join(sel)}
  FROM m
), fin AS (
  SELECT k, n_rows,
         ({b_raw}) - grand_s * grand_s / CAST(n_rows AS DOUBLE) AS ss_between,
         ({ssw}) AS ss_within
  FROM red
)
SELECT k, n_rows, ss_between, ss_within,
       (ss_between / (CAST(k AS DOUBLE) - 1.0))
         / (ss_within / (CAST(n_rows AS DOUBLE) - CAST(k AS DOUBLE))) AS f_stat,
       ss_between / (ss_between + ss_within) AS eta_sq
FROM fin
"""


def q_anova_oneway(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-way ANOVA of line quantity across the three return flags: does
    return behavior associate with order size AT ALL, before pairwise
    tests? F = (SSB/(k−1)) / (SSW/(N−k)) with η² = SSB/SST as the effect
    size the F-value alone doesn't give.

    Exactness: per-group (n, Σx, Σx²) are exact INTEGER moments of the
    integer quantity metric in ONE map-side-combinable hash agg — every
    sum stays inside the exact-double window far past sf100 (Σx² ≤
    2500·rows); the cross-group reduction extracts each literal flag's
    term as a named conditional aggregate and adds them in a FIXED
    left-to-right IEEE sequence (see the module-level note for the two
    money-metric variants this design replaced). Scale shape: nothing
    after the first aggregate touches data."""
    li = load_table(spark, sf_dir, "lineitem")
    x = F.col("l_quantity").cast("long")
    m = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(x.cast("decimal(38,0)")).cast("double").alias("s"),
        F.sum((x * x).cast("decimal(38,0)")).cast("double").alias("ss"),
    )
    return _f_stat_from_group_moments(m, "l_returnflag")


_SQL_QTY = "CAST(l_quantity AS BIGINT)"

_ORACLE_ANOVA = _sql_f_from_moments(
    f"""
WITH m AS (
  SELECT l_returnflag,
         COUNT(*) AS n,
         CAST(SUM(CAST({_SQL_QTY} AS DECIMAL(38,0))) AS DOUBLE) AS s,
         CAST(SUM(CAST({_SQL_QTY} * {_SQL_QTY} AS DECIMAL(38,0))) AS DOUBLE) AS ss
  FROM lineitem GROUP BY 1
)""",
    "l_returnflag",
)


def q_levene_brown_forsythe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brown–Forsythe test (the median-centered Levene): one-way ANOVA on
    z = |x − median(group)| — are the three return flags' quantity
    SPREADS equal? This is the assumption check behind every pooled-
    variance comparison; the median centering (vs Levene's mean) is what
    makes it robust to heavy-tailed metrics.

    The group median is the exact lower-median rank pick ((n+1) DIV 2,
    integer DIV on both engines) via one per-group sort window; z is then
    an exact small integer and the W statistic reuses the ANOVA reduction
    verbatim. Scale shape: one keyed window + one hash agg, both on the
    group key — a single shuffle, map-side combinable aggregation."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag", F.col("l_quantity").cast("long").alias("qty")
    )
    w = Window.partitionBy("l_returnflag").orderBy("qty")
    ranked = li.select(
        "l_returnflag",
        "qty",
        F.row_number().over(w).alias("rk"),
        F.count(F.lit(1)).over(Window.partitionBy("l_returnflag")).alias("cnt"),
    )
    med = ranked.filter(
        F.col("rk") == F.expr("(cnt + 1) DIV 2")
    ).select("l_returnflag", F.col("qty").alias("med"))
    z = F.abs(F.col("qty") - F.col("med"))
    m = (
        li.join(F.broadcast(med), "l_returnflag")
        .groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(z.cast("decimal(38,0)")).cast("double").alias("s"),
            F.sum((z * z).cast("decimal(38,0)")).cast("double").alias("ss"),
        )
    )
    out = _f_stat_from_group_moments(m, "l_returnflag")
    return out.select(
        "k",
        "n_rows",
        F.col("ss_between").alias("ss_between_z"),
        F.col("ss_within").alias("ss_within_z"),
        F.col("f_stat").alias("w_stat"),
        F.col("eta_sq").alias("eta_sq_z"),
    )


_ORACLE_LEVENE = f"""
SELECT k, n_rows,
       ss_between AS ss_between_z, ss_within AS ss_within_z,
       f_stat AS w_stat, eta_sq AS eta_sq_z
FROM (
{_sql_f_from_moments(f'''
WITH qty_t AS (
  SELECT l_returnflag, {_SQL_QTY} AS qty FROM lineitem
), ranked AS (
  SELECT l_returnflag, qty,
         ROW_NUMBER() OVER (PARTITION BY l_returnflag ORDER BY qty) AS rk,
         COUNT(*) OVER (PARTITION BY l_returnflag) AS cnt
  FROM qty_t
), med AS (
  SELECT l_returnflag, qty AS med FROM ranked WHERE rk = (cnt + 1) // 2
), m AS (
  SELECT q.l_returnflag,
         COUNT(*) AS n,
         CAST(SUM(CAST(ABS(q.qty - med.med) AS DECIMAL(38,0))) AS DOUBLE) AS s,
         CAST(SUM(CAST(ABS(q.qty - med.med) * ABS(q.qty - med.med)
                       AS DECIMAL(38,0))) AS DOUBLE) AS ss
  FROM qty_t q JOIN med USING (l_returnflag)
  GROUP BY 1
)''', "l_returnflag")}
)
"""


_CV_FP = 10**12


def q_cramers_v(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cramér's V for market segment × nation over customers: the
    bounded [0,1] EFFECT SIZE a raw χ² can't give (χ² grows with N even
    for a fixed association, so at 100 TB everything is "significant" —
    V = sqrt(χ²/(N·min(r−1,c−1))) is the number you can compare across
    table sizes). Same integer-form per-cell term and fixed-point sum as
    ``chi_square_assoc``; sqrt is the allowlisted correctly-rounded
    irrational. One hash agg to the 125-cell table; window marginals on
    that frame; zero further data passes."""
    cust = load_table(spark, sf_dir, "customer")
    cells = cust.groupBy("c_mktsegment", "c_nationkey").agg(
        F.count(F.lit(1)).alias("observed")
    )
    w_row = Window.partitionBy("c_mktsegment")
    w_col = Window.partitionBy("c_nationkey")
    w_all = Window.partitionBy()
    with_marg = cells.select(
        "observed",
        F.sum("observed").over(w_row).alias("row_tot"),
        F.sum("observed").over(w_col).alias("col_tot"),
        F.sum("observed").over(w_all).alias("grand"),
        F.size(F.collect_set("c_mktsegment").over(w_all)).alias("r"),
        F.size(F.collect_set("c_nationkey").over(w_all)).alias("c"),
    )
    d18 = "decimal(18,0)"
    num = F.col("observed").cast(d18) * F.col("grand").cast(d18) - F.col(
        "row_tot"
    ).cast(d18) * F.col("col_tot").cast(d18)
    dd = num.cast("double")
    den = (
        F.col("row_tot").cast("double")
        * F.col("col_tot").cast("double")
        * F.col("grand").cast("double")
    )
    term = dd * dd / den
    red = with_marg.agg(
        (
            F.sum(F.floor(term * F.lit(float(_CV_FP))).cast("decimal(38,0)"))
            .cast("double")
            / F.lit(float(_CV_FP))
        ).alias("chi_square"),
        F.max("grand").alias("n_rows"),
        F.max("r").alias("r"),
        F.max("c").alias("c"),
    )
    dof = F.least(F.col("r") - 1, F.col("c") - 1).cast("double")
    return red.select(
        "chi_square",
        F.col("n_rows").cast("long").alias("n_rows"),
        F.col("r").cast("int").alias("r"),
        F.col("c").cast("int").alias("c"),
        F.sqrt(F.col("chi_square") / (F.col("n_rows").cast("double") * dof)).alias(
            "cramers_v"
        ),
    )


_ORACLE_CRAMERS_V = f"""
WITH cells AS (
  SELECT c_mktsegment, c_nationkey, COUNT(*) AS observed
  FROM customer GROUP BY 1, 2
), marg AS (
  SELECT observed,
         SUM(observed) OVER (PARTITION BY c_mktsegment) AS row_tot,
         SUM(observed) OVER (PARTITION BY c_nationkey) AS col_tot,
         SUM(observed) OVER () AS grand,
         COUNT(DISTINCT c_mktsegment) OVER () AS r,
         COUNT(DISTINCT c_nationkey) OVER () AS c
  FROM cells
), terms AS (
  SELECT grand, r, c,
         CAST(CAST(observed AS DECIMAL(18,0)) * CAST(grand AS DECIMAL(18,0))
              - CAST(row_tot AS DECIMAL(18,0)) * CAST(col_tot AS DECIMAL(18,0))
              AS DOUBLE) AS dd,
         CAST(row_tot AS DOUBLE) * CAST(col_tot AS DOUBLE) * CAST(grand AS DOUBLE) AS den
  FROM marg
), red AS (
  SELECT CAST(SUM(CAST(FLOOR(dd * dd / den * {_CV_FP}.0) AS DECIMAL(38,0))) AS DOUBLE)
           / {_CV_FP}.0 AS chi_square,
         CAST(MAX(grand) AS BIGINT) AS n_rows,
         CAST(MAX(r) AS INTEGER) AS r,
         CAST(MAX(c) AS INTEGER) AS c
  FROM terms
)
SELECT chi_square, n_rows, r, c,
       sqrt(chi_square / (CAST(n_rows AS DOUBLE)
                          * CAST(LEAST(r - 1, c - 1) AS DOUBLE))) AS cramers_v
FROM red
"""


# χ²(1 df, α=0.05) = 3.84146 — as the rational compare (d² · 10^5 vs
# 384146 · N) so the flag is integer-exact, no CDF anywhere.
_SRM_CRIT_NUM = 384146
_SRM_CRIT_DEN = 10**5


def q_ab_srm_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample-ratio-mismatch guard for a 50/50 md5-hash split of event
    users: the health check every A/B readout must pass FIRST (a skewed
    split means assignment/logging is broken and all downstream stats are
    invalid — it fires in ~6% of real experiments, Fabijan et al. 2019).
    χ²(1) for equal expected halves reduces to (n0−n1)²/(n0+n1); the
    at-α=0.05 flag is the exact integer cross-multiplication against the
    literal critical value, so the verdict column involves no float
    compare at all. One distinct-users agg; everything else is a 1-row
    frame."""
    users = (
        load_table(spark, sf_dir, "events")
        .select("user_id")
        .distinct()
        .select(
            F.pmod(
                F.conv(
                    F.substring(F.md5(F.col("user_id").cast("string")), 1, 15), 16, 10
                ).cast("bigint"),
                F.lit(2),
            ).alias("arm")
        )
    )
    red = users.agg(
        F.sum(F.when(F.col("arm") == 0, 1).otherwise(0)).cast("long").alias("n0"),
        F.sum(F.when(F.col("arm") == 1, 1).otherwise(0)).cast("long").alias("n1"),
    )
    d = F.col("n0") - F.col("n1")
    n = F.col("n0") + F.col("n1")
    return red.select(
        "n0",
        "n1",
        n.alias("n_users"),
        (
            (d * d).cast("double") / n.cast("double")
        ).alias("chi_square"),
        F.when(
            d * d * F.lit(_SRM_CRIT_DEN) > F.lit(_SRM_CRIT_NUM) * n, 1
        )
        .otherwise(0)
        .cast("int")
        .alias("srm_flag"),
    )


_ORACLE_SRM = f"""
WITH arms AS (
  SELECT {_sql_hex_to_int("md5(CAST(user_id AS VARCHAR))", 1, 15)} % 2 AS arm
  FROM (SELECT DISTINCT user_id FROM events)
), red AS (
  SELECT CAST(SUM(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n0,
         CAST(SUM(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1
  FROM arms
)
SELECT n0, n1, n0 + n1 AS n_users,
       CAST((n0 - n1) * (n0 - n1) AS DOUBLE) / CAST(n0 + n1 AS DOUBLE) AS chi_square,
       CAST(CASE WHEN (n0 - n1) * (n0 - n1) * {_SRM_CRIT_DEN} > {_SRM_CRIT_NUM} * (n0 + n1)
                 THEN 1 ELSE 0 END AS INTEGER) AS srm_flag
FROM red
"""



_SEGMENTS = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]


def q_standardized_rate_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DIRECTLY STANDARDIZED urgent-order rates per nation: each nation's
    per-segment urgent rate re-weighted by the GLOBAL segment mix — the
    epidemiology/growth-analytics adjustment that makes rates comparable
    across populations with different composition (a nation can show a
    higher crude rate purely because its customers skew toward a
    high-urgency segment; standardization removes exactly that
    confounder — Simpson's-paradox insurance for KPI comparisons).

    Exactness: cell counts are integers; each nation's standardized rate
    is Σ_s w_s·r_ns over the LITERAL five-segment domain in one fixed
    left-to-right IEEE sequence (the ANOVA reduction discipline), with
    w_s = global segment share and r_ns the cell rate — empty (nation,
    segment) cells contribute 0 (documented convention; at any realistic
    SF all 125 cells are populated). Scale shape: one orders⋈customer
    equi-join, one (nation, segment) hash agg, then arithmetic on the
    125-cell frame with two broadcast marginal joins."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderpriority"
    )
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey", "c_mktsegment")
    j = orders.join(cust, orders["o_custkey"] == cust["c_custkey"])
    cells = j.groupBy("c_nationkey", "c_mktsegment").agg(
        F.count(F.lit(1)).alias("tot"),
        F.sum(F.when(F.col("o_orderpriority") == "1-URGENT", 1).otherwise(0))
        .cast("long")
        .alias("urgent"),
    )
    seg_mix = cells.groupBy("c_mktsegment").agg(F.sum("tot").alias("seg_tot"))
    grand = seg_mix.agg(F.sum("seg_tot").alias("grand"))
    rate = F.col("urgent").cast("double") / F.col("tot").cast("double")
    w = F.col("seg_tot").cast("double") / F.col("grand").cast("double")
    terms = cells.join(F.broadcast(seg_mix), "c_mktsegment").crossJoin(
        F.broadcast(grand)
    )
    aggs = [
        F.sum("tot").alias("n_orders"),
        F.sum("urgent").cast("long").alias("n_urgent"),
    ]
    for i, seg in enumerate(_SEGMENTS):
        aggs.append(
            F.max(F.when(F.col("c_mktsegment") == seg, w * rate)).alias(f"t{i}")
        )
    red = terms.groupBy("c_nationkey").agg(*aggs)
    std = sum(
        (F.coalesce(F.col(f"t{i}"), F.lit(0.0)) for i in range(1, len(_SEGMENTS))),
        F.coalesce(F.col("t0"), F.lit(0.0)),
    )
    return red.select(
        "c_nationkey",
        "n_orders",
        (F.col("n_urgent").cast("double") / F.col("n_orders").cast("double")).alias(
            "crude_rate"
        ),
        std.alias("standardized_rate"),
    ).orderBy("c_nationkey")


def _sql_standardized_rate() -> str:
    terms = " + ".join(
        f"COALESCE(MAX(CASE WHEN c_mktsegment = '{seg}' THEN w * rate END), 0.0)"
        for seg in _SEGMENTS
    )
    return f"""
WITH cells AS (
  SELECT c_nationkey, c_mktsegment,
         COUNT(*) AS tot,
         CAST(SUM(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END)
              AS BIGINT) AS urgent
  FROM orders JOIN customer ON o_custkey = c_custkey
  GROUP BY 1, 2
), seg_mix AS (
  SELECT c_mktsegment, SUM(tot) AS seg_tot FROM cells GROUP BY 1
), grand AS (SELECT SUM(seg_tot) AS grand FROM seg_mix)
SELECT c_nationkey,
       CAST(SUM(tot) AS BIGINT) AS n_orders,
       CAST(SUM(urgent) AS DOUBLE) / CAST(SUM(tot) AS DOUBLE) AS crude_rate,
       {terms} AS standardized_rate
FROM (
  SELECT c.c_nationkey, c.c_mktsegment, c.tot, c.urgent,
         CAST(c.urgent AS DOUBLE) / CAST(c.tot AS DOUBLE) AS rate,
         CAST(m.seg_tot AS DOUBLE) / CAST(g.grand AS DOUBLE) AS w
  FROM cells c JOIN seg_mix m USING (c_mktsegment) CROSS JOIN grand g
)
GROUP BY c_nationkey
ORDER BY c_nationkey
"""


# The five order priorities — literal group domain for the k-group rank
# test (same fixed-order-reduction discipline as _FLAGS / _SEGMENTS).
_PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]


def q_kruskal_wallis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kruskal–Wallis H across the five order priorities on order value —
    the k-group generalization of ``q_mann_whitney_u`` and the rank
    (distribution-free) counterpart of ``q_anova_oneway``: does order
    value differ in LOCATION across priorities when normality can't be
    assumed?

    Exact-integer rank algebra (the Mann–Whitney midrank identity): per
    distinct value with t predecessors and c tied rows, the DOUBLED
    midrank is 2t + c + 1, so each group's doubled rank sum
    R2_g = Σ c_g·(2t + c + 1) stays integral. Then
    H = 12/(N(N+1)) · Σ_g (R2_g/2)²/n_g − 3(N+1), with the tie
    correction C = 1 − Σ(c³−c)/(N³−N) and H_adj = H/C. The Σ_g runs
    over the LITERAL five-priority domain as one fixed left-to-right
    IEEE expression; Σ(c³−c) is an exact BIGINT. Same ``_cum_prev``-bucketed value-domain
    window shape (and the same 100 TB bucketed-rank escape notes) as
    ``ks_two_sample``/``mann_whitney_u``."""
    orders = load_table(spark, sf_dir, "orders")
    conds = [
        F.sum(F.when(F.col("o_orderpriority") == p, 1).otherwise(0))
        .cast("long")
        .alias(f"c{i}")
        for i, p in enumerate(_PRIORITIES)
    ]
    per_v = orders.groupBy(F.col("o_totalprice").alias("v")).agg(*conds)
    c_tot = sum(
        (F.col(f"c{i}") for i in range(1, len(_PRIORITIES))), F.col("c0")
    )
    per_v = per_v.select("v", *[f"c{i}" for i in range(len(_PRIORITIES))],
                         c_tot.alias("c"))
    ranked = _cum_prev(per_v, ["v"], {"t": F.col("c")}, materialize=True).select(
        *[f"c{i}" for i in range(len(_PRIORITIES))],
        "c",
        "t",
    )
    aggs = [
        F.sum("c").cast("long").alias("n_rows"),
        F.sum(F.col("c") * F.col("c") * F.col("c") - F.col("c"))
        .cast("long")
        .alias("tie_sum"),
    ]
    for i in range(len(_PRIORITIES)):
        aggs.append(F.sum(F.col(f"c{i}")).cast("long").alias(f"n{i}"))
        aggs.append(
            F.sum(
                F.col(f"c{i}")
                * (F.lit(2) * F.col("t") + F.col("c") + F.lit(1))
            )
            .cast("long")
            .alias(f"r2_{i}")
        )
    red = ranked.agg(*aggs)
    nd = F.col("n_rows").cast("double")

    def term(i: int):
        r = F.col(f"r2_{i}").cast("double")
        return (r * r) / (F.lit(4.0) * F.col(f"n{i}").cast("double"))

    s = sum((term(i) for i in range(1, len(_PRIORITIES))), term(0))
    h = F.lit(12.0) / (nd * (nd + F.lit(1.0))) * s - F.lit(3.0) * (
        nd + F.lit(1.0)
    )
    c_corr = F.lit(1.0) - F.col("tie_sum").cast("double") / (
        nd * nd * nd - nd
    )
    return red.select(
        "n_rows",
        h.alias("h_stat"),
        c_corr.alias("tie_correction"),
        (h / c_corr).alias("h_adj"),
    )


def _sql_kruskal_wallis() -> str:
    conds = ",\n         ".join(
        f"CAST(SUM(CASE WHEN o_orderpriority = '{p}' THEN 1 ELSE 0 END) AS BIGINT) AS c{i}"
        for i, p in enumerate(_PRIORITIES)
    )
    c_tot = " + ".join(f"c{i}" for i in range(len(_PRIORITIES)))
    per_g = ",\n         ".join(
        f"CAST(SUM(c{i}) AS BIGINT) AS n{i},\n         "
        f"CAST(SUM(c{i} * (2 * t + c + 1)) AS BIGINT) AS r2_{i}"
        for i in range(len(_PRIORITIES))
    )
    terms = " + ".join(
        f"(CAST(r2_{i} AS DOUBLE) * CAST(r2_{i} AS DOUBLE))"
        f" / (4.0 * CAST(n{i} AS DOUBLE))"
        for i in range(len(_PRIORITIES))
    )
    return f"""
WITH per_v AS (
  SELECT o_totalprice AS v,
         {conds}
  FROM orders GROUP BY 1
), per_c AS (
  SELECT *, {c_tot} AS c FROM per_v
), ranked AS (
  SELECT *, COALESCE(SUM(c) OVER (ORDER BY v
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS t
  FROM per_c
), red AS (
  SELECT CAST(SUM(c) AS BIGINT) AS n_rows,
         CAST(SUM(c * c * c - c) AS BIGINT) AS tie_sum,
         {per_g}
  FROM ranked
)
SELECT n_rows,
       12.0 / (CAST(n_rows AS DOUBLE) * (CAST(n_rows AS DOUBLE) + 1.0))
         * ({terms})
         - 3.0 * (CAST(n_rows AS DOUBLE) + 1.0) AS h_stat,
       1.0 - CAST(tie_sum AS DOUBLE)
         / (CAST(n_rows AS DOUBLE) * CAST(n_rows AS DOUBLE) * CAST(n_rows AS DOUBLE)
            - CAST(n_rows AS DOUBLE)) AS tie_correction,
       (12.0 / (CAST(n_rows AS DOUBLE) * (CAST(n_rows AS DOUBLE) + 1.0))
         * ({terms})
         - 3.0 * (CAST(n_rows AS DOUBLE) + 1.0))
       / (1.0 - CAST(tie_sum AS DOUBLE)
         / (CAST(n_rows AS DOUBLE) * CAST(n_rows AS DOUBLE) * CAST(n_rows AS DOUBLE)
            - CAST(n_rows AS DOUBLE))) AS h_adj
FROM red
"""


MH_BAL_THRESHOLD = 4500.0  # literal exposure cut on customer account balance


def q_mantel_haenszel_or(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mantel–Haenszel pooled odds ratio: association between a
    high-balance customer (exposure) and urgent orders (outcome), pooled
    ACROSS market segments — the stratified 2×2 estimator that, like
    ``q_standardized_rate_mix``, removes composition confounding, but
    for odds ratios: MH_OR = Σ_s(a_s·d_s/n_s) / Σ_s(b_s·c_s/n_s). The
    crude OR is reported next to it so the confounding gap is visible.

    Exactness: the four cells per stratum are integer counts from ONE
    hash aggregate; the two Σ_s run over the LITERAL five-segment domain
    in fixed left-to-right order (the module discipline); no logs — the
    estimate is a pure rational function of counts. Scale shape: one
    orders⋈customer equi-join (customer side broadcastable at dashboard
    scale, shuffled at 100 TB), one 4-conditional-count agg to ≤5 rows,
    then arithmetic."""
    orders = load_table(spark, sf_dir, "orders").select("o_custkey", "o_orderpriority")
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment", "c_acctbal"
    )
    j = orders.join(cust, orders["o_custkey"] == cust["c_custkey"])
    e = (F.col("c_acctbal") > F.lit(MH_BAL_THRESHOLD)).cast("int")
    d = (F.col("o_orderpriority") == "1-URGENT").cast("int")
    cells = j.groupBy("c_mktsegment").agg(
        F.sum(e * d).cast("long").alias("a"),
        F.sum(e * (1 - d)).cast("long").alias("b"),
        F.sum((1 - e) * d).cast("long").alias("c"),
        F.sum((1 - e) * (1 - d)).cast("long").alias("dd"),
    )
    aggs = [
        F.sum(F.col("a") + F.col("b") + F.col("c") + F.col("dd"))
        .cast("long")
        .alias("n_rows"),
        F.sum("a").cast("long").alias("ta"),
        F.sum("b").cast("long").alias("tb"),
        F.sum("c").cast("long").alias("tc"),
        F.sum("dd").cast("long").alias("td"),
    ]
    nd = (F.col("a") + F.col("b") + F.col("c") + F.col("dd")).cast("double")
    num_t = F.col("a").cast("double") * F.col("dd").cast("double") / nd
    den_t = F.col("b").cast("double") * F.col("c").cast("double") / nd
    for i, seg in enumerate(_SEGMENTS):
        aggs.append(F.max(F.when(F.col("c_mktsegment") == seg, num_t)).alias(f"u{i}"))
        aggs.append(F.max(F.when(F.col("c_mktsegment") == seg, den_t)).alias(f"v{i}"))
    red = cells.agg(*aggs)
    num = sum((F.col(f"u{i}") for i in range(1, len(_SEGMENTS))), F.col("u0"))
    den = sum((F.col(f"v{i}") for i in range(1, len(_SEGMENTS))), F.col("v0"))
    crude = (F.col("ta").cast("double") * F.col("td").cast("double")) / (
        F.col("tb").cast("double") * F.col("tc").cast("double")
    )
    return red.select(
        "n_rows",
        crude.alias("crude_or"),
        (num / den).alias("mh_or"),
    )


def _sql_mantel_haenszel() -> str:
    u_sel = ",\n         ".join(
        f"MAX(CASE WHEN c_mktsegment = '{seg}' THEN CAST(a AS DOUBLE) * CAST(dd AS DOUBLE)"
        f" / CAST(a + b + c + dd AS DOUBLE) END) AS u{i},\n         "
        f"MAX(CASE WHEN c_mktsegment = '{seg}' THEN CAST(b AS DOUBLE) * CAST(c AS DOUBLE)"
        f" / CAST(a + b + c + dd AS DOUBLE) END) AS v{i}"
        for i, seg in enumerate(_SEGMENTS)
    )
    num = " + ".join(f"u{i}" for i in range(len(_SEGMENTS)))
    den = " + ".join(f"v{i}" for i in range(len(_SEGMENTS)))
    return f"""
WITH cells AS (
  SELECT c_mktsegment,
         CAST(SUM(CASE WHEN c_acctbal > {MH_BAL_THRESHOLD!r} AND o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END) AS BIGINT) AS a,
         CAST(SUM(CASE WHEN c_acctbal > {MH_BAL_THRESHOLD!r} AND o_orderpriority <> '1-URGENT' THEN 1 ELSE 0 END) AS BIGINT) AS b,
         CAST(SUM(CASE WHEN c_acctbal <= {MH_BAL_THRESHOLD!r} AND o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END) AS BIGINT) AS c,
         CAST(SUM(CASE WHEN c_acctbal <= {MH_BAL_THRESHOLD!r} AND o_orderpriority <> '1-URGENT' THEN 1 ELSE 0 END) AS BIGINT) AS dd
  FROM orders JOIN customer ON o_custkey = c_custkey
  GROUP BY 1
), red AS (
  SELECT CAST(SUM(a + b + c + dd) AS BIGINT) AS n_rows,
         CAST(SUM(a) AS BIGINT) AS ta, CAST(SUM(b) AS BIGINT) AS tb,
         CAST(SUM(c) AS BIGINT) AS tc, CAST(SUM(dd) AS BIGINT) AS td,
         {u_sel}
  FROM cells
)
SELECT n_rows,
       (CAST(ta AS DOUBLE) * CAST(td AS DOUBLE))
         / (CAST(tb AS DOUBLE) * CAST(tc AS DOUBLE)) AS crude_or,
       ({num}) / ({den}) AS mh_or
FROM red
"""


CA_CRIT_5PCT = 3.8415  # chi-square(1) upper 5% point (literal, like SRM)


def q_cochran_armitage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cochran–Armitage trend test: does the probability that a line item
    is RETURNED rise (or fall) monotonically with its quantity? The
    k-proportion chi-square (``cramers_v``/``chi_square_assoc``) treats
    groups as unordered and burns k−1 degrees of freedom; when the groups
    carry a natural ORDER (quantity 1..50 as scores w), the 1-df trend
    statistic T = Σw_i(r_i − n_i·p̄) against Var(T) =
    p̄(1−p̄)(Σw_i²n_i − (Σw_i n_i)²/N) is the far more powerful test —
    the standard dose-response screen.

    Exactness: the sufficient statistics (N, R, Σwn, Σwr, Σw²n) are exact
    BIGINTs from ONE hash agg (w ≤ 50 so Σw²n < 2^63 past sf1000);
    T, Var, z² are one fixed IEEE sequence on those integers — no
    literal-domain reduction needed because every cross-group sum is
    integral. The 5% verdict compares the deterministic z² to the
    literal chi-square(1) critical value."""
    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_quantity").cast("long").alias("w"),
        F.when(F.col("l_returnflag") == "R", F.lit(1)).otherwise(F.lit(0)).alias("r"),
    )
    m = li.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("r").cast("long").alias("r_all"),
        F.sum("w").cast("long").alias("swn"),
        F.sum(F.col("w") * F.col("r")).cast("long").alias("swr"),
        F.sum(F.col("w") * F.col("w")).cast("long").alias("sw2n"),
    )
    nd = F.col("n").cast("double")
    rd = F.col("r_all").cast("double")
    swn = F.col("swn").cast("double")
    swr = F.col("swr").cast("double")
    sw2n = F.col("sw2n").cast("double")
    p = rd / nd
    t = swr - swn * p
    var = p * (F.lit(1.0) - p) * (sw2n - swn * swn / nd)
    z2 = t * t / var
    return m.select(
        "n",
        F.col("r_all").alias("n_returned"),
        t.alias("t_stat"),
        var.alias("var_t"),
        z2.alias("z_squared"),
        (z2 > F.lit(CA_CRIT_5PCT)).cast("int").alias("trend_flag"),
    )


_ORACLE_COCHRAN_ARMITAGE = f"""
WITH m AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS BIGINT) AS r_all,
         CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS swn,
         CAST(SUM(CASE WHEN l_returnflag = 'R' THEN CAST(l_quantity AS BIGINT) ELSE 0 END) AS BIGINT) AS swr,
         CAST(SUM(CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT)) AS BIGINT) AS sw2n
  FROM lineitem
), f AS (
  SELECT n, r_all,
         CAST(swr AS DOUBLE) - CAST(swn AS DOUBLE) * (CAST(r_all AS DOUBLE) / CAST(n AS DOUBLE)) AS t_stat,
         (CAST(r_all AS DOUBLE) / CAST(n AS DOUBLE))
           * (1.0 - CAST(r_all AS DOUBLE) / CAST(n AS DOUBLE))
           * (CAST(sw2n AS DOUBLE)
              - CAST(swn AS DOUBLE) * CAST(swn AS DOUBLE) / CAST(n AS DOUBLE)) AS var_t
  FROM m
)
SELECT n, r_all AS n_returned, t_stat, var_t,
       t_stat * t_stat / var_t AS z_squared,
       CAST(t_stat * t_stat / var_t > CAST({CA_CRIT_5PCT!r} AS DOUBLE) AS INT) AS trend_flag
FROM f
"""


# ---------------------------------------------------------------------------
# SPRT: Wald's sequential probability ratio test on the event stream
# ---------------------------------------------------------------------------

import math as _math

SPRT_P0 = 0.19  # H0 purchase share
SPRT_P1 = 0.21  # H1 purchase share
SPRT_ALPHA = 0.05
SPRT_BETA = 0.05
# ln() appears ONLY on Python literals, folded here — both engines receive
# identical doubles (the Benford/HLL-LUT discipline; no engine ln anywhere).
SPRT_L1 = _math.log(SPRT_P1 / SPRT_P0)  # per-success LLR increment
SPRT_L0 = _math.log((1.0 - SPRT_P1) / (1.0 - SPRT_P0))  # per-failure increment
SPRT_A = _math.log((1.0 - SPRT_BETA) / SPRT_ALPHA)  # accept-H1 boundary
SPRT_B = _math.log(SPRT_BETA / (1.0 - SPRT_ALPHA))  # accept-H0 boundary


def q_sprt_sequential(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wald's SPRT over the experiment stream: per arm (the md5-free
    user_id%2 split), the day-by-day cumulative log-likelihood ratio of
    H1: purchase share = 0.21 against H0: 0.19, with the first boundary
    crossing and verdict — the sequential test that lets an experiment
    STOP EARLY with guaranteed α/β instead of waiting for a fixed
    horizon (Wald 1945; the peeking problem solved by design).

    Determinism without transcendentals-on-data: the per-day cumulative
    successes/failures are INTEGER running sums (exact under any window
    evaluation strategy — DuckDB computes windowed float SUMs through a
    segment tree whose pairwise order differs from Spark's running
    accumulation, so a float running sum would drift; integers cannot),
    and LLR_day = cum_s·l1 + cum_f·l0 is ONE fixed IEEE expression on
    them, with l1/l0/A/B Python-folded literals. Crossing days are MINs
    over deterministic flags. Scale: one (arm, day) hash agg, then
    day-domain windows per arm — two partitions of ~|days| rows."""
    events = load_table(spark, sf_dir, "events")
    daily = (
        events.select(
            (F.col("user_id") % 2).alias("arm"),
            F.to_date("ts").alias("day"),
            F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias("s"),
        )
        .groupBy("arm", "day")
        .agg(
            F.sum("s").cast("long").alias("s_d"),
            F.sum(F.lit(1) - F.col("s")).cast("long").alias("f_d"),
        )
    )
    w = Window.partitionBy("arm").orderBy("day").rowsBetween(
        Window.unboundedPreceding, 0
    )
    cum = daily.select(
        "arm",
        "day",
        F.sum("s_d").over(w).alias("cs"),
        F.sum("f_d").over(w).alias("cf"),
    )
    llr = F.col("cs").cast("double") * F.lit(SPRT_L1) + F.col("cf").cast(
        "double"
    ) * F.lit(SPRT_L0)
    scored = cum.select("arm", "day", "cs", "cf", llr.alias("llr"))
    agg = scored.groupBy("arm").agg(
        F.count(F.lit(1)).cast("long").alias("n_days"),
        F.max("cs").cast("long").alias("n_success"),
        F.max("cf").cast("long").alias("n_failure"),
        F.max(F.when(F.col("llr") >= F.lit(SPRT_A), 1).otherwise(0)).alias("hit_up"),
        F.min(F.when(F.col("llr") >= F.lit(SPRT_A), F.col("day"))).alias("d_up"),
        F.max(F.when(F.col("llr") <= F.lit(SPRT_B), 1).otherwise(0)).alias("hit_lo"),
        F.min(F.when(F.col("llr") <= F.lit(SPRT_B), F.col("day"))).alias("d_lo"),
    )
    final = scored.withColumn(
        "_rn",
        F.row_number().over(Window.partitionBy("arm").orderBy(F.desc("day"))),
    ).filter(F.col("_rn") == 1).select("arm", F.col("llr").alias("final_llr"))
    j = agg.join(F.broadcast(final), "arm")
    verdict = (
        F.when((F.col("hit_up") == 0) & (F.col("hit_lo") == 0), F.lit("continue"))
        .when(
            (F.col("hit_lo") == 0)
            | ((F.col("hit_up") == 1) & (F.col("d_up") < F.col("d_lo"))),
            F.lit("accept_h1"),
        )
        .otherwise(F.lit("accept_h0"))
    )
    return j.select(
        "arm",
        "n_days",
        "n_success",
        "n_failure",
        "final_llr",
        F.coalesce(F.least("d_up", "d_lo"), F.lit(None).cast("date")).alias(
            "decision_day"
        ),
        verdict.alias("verdict"),
    ).orderBy("arm")


_ORACLE_SPRT = f"""
WITH daily AS (
  SELECT user_id % 2 AS arm, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day,
         CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS s_d,
         CAST(SUM(CASE WHEN event_type = 'purchase' THEN 0 ELSE 1 END) AS BIGINT) AS f_d
  FROM events GROUP BY 1, 2
), cum AS (
  SELECT arm, day,
         SUM(s_d) OVER (PARTITION BY arm ORDER BY day
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cs,
         SUM(f_d) OVER (PARTITION BY arm ORDER BY day
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cf
  FROM daily
), scored AS (
  SELECT arm, day, cs, cf,
         CAST(cs AS DOUBLE) * CAST('{SPRT_L1!r}' AS DOUBLE)
           + CAST(cf AS DOUBLE) * CAST('{SPRT_L0!r}' AS DOUBLE) AS llr
  FROM cum
), agg AS (
  SELECT arm,
         CAST(COUNT(*) AS BIGINT) AS n_days,
         CAST(MAX(cs) AS BIGINT) AS n_success,
         CAST(MAX(cf) AS BIGINT) AS n_failure,
         MAX(CASE WHEN llr >= CAST('{SPRT_A!r}' AS DOUBLE) THEN 1 ELSE 0 END) AS hit_up,
         MIN(CASE WHEN llr >= CAST('{SPRT_A!r}' AS DOUBLE) THEN day END) AS d_up,
         MAX(CASE WHEN llr <= CAST('{SPRT_B!r}' AS DOUBLE) THEN 1 ELSE 0 END) AS hit_lo,
         MIN(CASE WHEN llr <= CAST('{SPRT_B!r}' AS DOUBLE) THEN day END) AS d_lo
  FROM scored GROUP BY 1
), fin AS (
  SELECT arm, llr AS final_llr FROM (
    SELECT arm, llr, ROW_NUMBER() OVER (PARTITION BY arm ORDER BY day DESC) AS rn
    FROM scored
  ) WHERE rn = 1
)
SELECT agg.arm, n_days, n_success, n_failure, final_llr,
       LEAST(COALESCE(d_up, d_lo), COALESCE(d_lo, d_up)) AS decision_day,
       CASE WHEN hit_up = 0 AND hit_lo = 0 THEN 'continue'
            WHEN hit_lo = 0 OR (hit_up = 1 AND d_up < d_lo) THEN 'accept_h1'
            ELSE 'accept_h0' END AS verdict
FROM agg JOIN fin ON agg.arm = fin.arm
ORDER BY agg.arm
"""


KAPPA_CHARS = 300  # rater A: character-length rule
KAPPA_TOKENS = 55  # rater B: token-count rule


def q_cohens_kappa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohen's kappa between two document classifiers — rater A flags
    docs with ≥{KAPPA_CHARS} chars, rater B docs with ≥{KAPPA_TOKENS}
    whitespace tokens — the chance-corrected agreement measure: raw
    percent agreement rewards raters that both say "yes" to everything,
    κ = (p_o − p_e)/(1 − p_e) subtracts the agreement two INDEPENDENT
    raters with these margins would produce by luck. The standard
    QA metric when two labeling pipelines (heuristic vs model, two
    annotator pools) must be reconciled before training on their labels.

    Exactness: the 2×2 agreement cells are integer counts from ONE hash
    agg; p_o, p_e, κ are a fixed IEEE sequence on them. Scale: one
    map-side-combinable aggregate, then arithmetic on a single row."""
    docs = load_table(spark, sf_dir, "documents")
    a = (F.col("n_chars") >= KAPPA_CHARS).cast("int")
    b = (
        F.size(F.filter(F.split(F.col("text"), " "), lambda t: t != ""))
        >= KAPPA_TOKENS
    ).cast("int")
    m = docs.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(a * b).cast("long").alias("yy"),
        F.sum(a * (1 - b)).cast("long").alias("yn"),
        F.sum((1 - a) * b).cast("long").alias("ny"),
        F.sum((1 - a) * (1 - b)).cast("long").alias("nn"),
    )
    nd = F.col("n").cast("double")
    po = (F.col("yy") + F.col("nn")).cast("double") / nd
    pe = (
        (F.col("yy") + F.col("yn")).cast("double")
        * (F.col("yy") + F.col("ny")).cast("double")
        + (F.col("ny") + F.col("nn")).cast("double")
        * (F.col("yn") + F.col("nn")).cast("double")
    ) / (nd * nd)
    return m.select(
        "n",
        "yy",
        "yn",
        "ny",
        "nn",
        po.alias("p_observed"),
        pe.alias("p_expected"),
        ((po - pe) / (F.lit(1.0) - pe)).alias("kappa"),
    )


q_cohens_kappa.__doc__ = q_cohens_kappa.__doc__ and (
    q_cohens_kappa.__doc__.replace("{KAPPA_CHARS}", str(KAPPA_CHARS))
    .replace("{KAPPA_TOKENS}", str(KAPPA_TOKENS))
)


_ORACLE_COHENS_KAPPA = f"""
WITH m AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(CASE WHEN n_chars >= {KAPPA_CHARS}
                        AND len(list_filter(string_split(text, ' '), t -> t <> '')) >= {KAPPA_TOKENS}
                       THEN 1 ELSE 0 END) AS BIGINT) AS yy,
         CAST(SUM(CASE WHEN n_chars >= {KAPPA_CHARS}
                        AND len(list_filter(string_split(text, ' '), t -> t <> '')) < {KAPPA_TOKENS}
                       THEN 1 ELSE 0 END) AS BIGINT) AS yn,
         CAST(SUM(CASE WHEN n_chars < {KAPPA_CHARS}
                        AND len(list_filter(string_split(text, ' '), t -> t <> '')) >= {KAPPA_TOKENS}
                       THEN 1 ELSE 0 END) AS BIGINT) AS ny,
         CAST(SUM(CASE WHEN n_chars < {KAPPA_CHARS}
                        AND len(list_filter(string_split(text, ' '), t -> t <> '')) < {KAPPA_TOKENS}
                       THEN 1 ELSE 0 END) AS BIGINT) AS nn
  FROM documents
)
SELECT n, yy, yn, ny, nn,
       CAST(yy + nn AS DOUBLE) / CAST(n AS DOUBLE) AS p_observed,
       (CAST(yy + yn AS DOUBLE) * CAST(yy + ny AS DOUBLE)
        + CAST(ny + nn AS DOUBLE) * CAST(yn + nn AS DOUBLE))
         / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)) AS p_expected,
       (CAST(yy + nn AS DOUBLE) / CAST(n AS DOUBLE)
        - (CAST(yy + yn AS DOUBLE) * CAST(yy + ny AS DOUBLE)
           + CAST(ny + nn AS DOUBLE) * CAST(yn + nn AS DOUBLE))
            / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)))
       / (1.0 - (CAST(yy + yn AS DOUBLE) * CAST(yy + ny AS DOUBLE)
                 + CAST(ny + nn AS DOUBLE) * CAST(yn + nn AS DOUBLE))
            / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE))) AS kappa
FROM m
"""


# ---------------------------------------------------------------------------
# Fleiss' kappa (round 10): the m-rater generalization of Cohen's kappa
# ---------------------------------------------------------------------------

FLEISS_YM_LO = 1996 * 12 + 1  # the 12 "rater" months: 1996-01 .. 1996-12
FLEISS_YM_HI = 1996 * 12 + 12
FLEISS_CATS = 3  # revenue terciles within each month


def q_fleiss_kappa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fleiss' kappa multi-rater agreement: each of m=12 months of 1996
    "rates" every nation into a revenue TERCILE (top/mid/bottom third by
    that month's revenue, competition ranking with nationkey tie-break —
    the kendalls_w rank frame discretized to categories), and kappa asks
    whether the months agree on who belongs where beyond chance —
    the m-rater generalization of ``cohens_kappa`` (2 raters, same
    module). P_i = (Σ_j n_ij² − m)/(m(m−1)), P̄ its mean, P_e = Σ_j p_j²;
    κ = (P̄ − P_e)/(1 − P_e). Every n_ij is an exact integer; the three
    category shares and κ are one IEEE sequence.

    Scale shape: scan → |nation|×|month| hash agg; ranking, tercile
    assignment, and the n_ij table all run on the 300-cell frame (25-row
    month partitions)."""
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    nation = load_table(spark, sf_dir, "nation").select("n_nationkey")
    ym = F.year("o_orderdate") * 12 + F.month("o_orderdate")
    rev = (
        orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .filter((ym >= FLEISS_YM_LO) & (ym <= FLEISS_YM_HI))
        .groupBy(F.col("c_nationkey").alias("nk"), ym.alias("ym"))
        .agg(
            F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("bigint"))
            .cast("long")
            .alias("y")
        )
    )
    months = spark.range(FLEISS_YM_LO, FLEISS_YM_HI + 1).select(
        F.col("id").cast("int").alias("ym")
    )
    spine = nation.select(F.col("n_nationkey").alias("nk")).crossJoin(
        F.broadcast(months)
    )
    dense = spine.join(rev, ["nk", "ym"], "left").select(
        "nk", "ym", F.coalesce("y", F.lit(0)).alias("y")
    )
    w = Window.partitionBy("ym").orderBy(F.desc("y"), F.asc("nk"))
    n_nations = nation.count()  # dimension-sized: 25 at every SF
    per_cat = (n_nations + FLEISS_CATS - 1) // FLEISS_CATS
    rated = dense.withColumn("rk", F.row_number().over(w)).withColumn(
        "cat", ((F.col("rk") - 1) / F.lit(per_cat)).cast("int")
    )
    nij = rated.groupBy("nk", "cat").agg(F.count(F.lit(1)).cast("long").alias("nij"))
    m = FLEISS_YM_HI - FLEISS_YM_LO + 1
    per_subject = nij.groupBy("nk").agg(
        F.sum(F.col("nij") * F.col("nij")).cast("long").alias("sq")
    )
    subj = per_subject.agg(
        F.count(F.lit(1)).cast("long").alias("n_subjects"),
        F.sum("sq").cast("long").alias("ssq"),
    )
    cat_tot = nij.groupBy("cat").agg(F.sum("nij").cast("long").alias("cj"))
    pe = cat_tot.agg(
        F.sum(
            (F.col("cj").cast("double") * F.col("cj").cast("double"))
        ).alias("sum_cj2"),
        F.sum("cj").cast("long").alias("tot"),
    )
    joined = subj.crossJoin(F.broadcast(pe))
    nd = F.col("n_subjects").cast("double")
    md = float(m)
    p_bar = (
        F.col("ssq").cast("double") - nd * F.lit(md)
    ) / (nd * F.lit(md) * F.lit(md - 1.0))
    p_e = F.col("sum_cj2") / (
        F.col("tot").cast("double") * F.col("tot").cast("double")
    )
    return joined.select(
        "n_subjects",
        F.lit(m).cast("long").alias("m_raters"),
        p_bar.alias("p_bar"),
        p_e.alias("p_e"),
        ((p_bar - p_e) / (F.lit(1.0) - p_e)).alias("fleiss_kappa"),
    )


def _sql_fleiss() -> str:
    m = FLEISS_YM_HI - FLEISS_YM_LO + 1
    # per_cat mirrors the Spark-side ceil(|nation|/cats) with |nation|=25
    return f"""
WITH rev AS (
  SELECT c_nationkey AS nk,
         YEAR(o_orderdate) * 12 + MONTH(o_orderdate) AS ym,
         CAST(SUM(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT) AS y
  FROM orders JOIN customer ON o_custkey = c_custkey
  WHERE YEAR(o_orderdate) * 12 + MONTH(o_orderdate)
        BETWEEN {FLEISS_YM_LO} AND {FLEISS_YM_HI}
  GROUP BY 1, 2
), months AS (
  SELECT UNNEST(range({FLEISS_YM_LO}, {FLEISS_YM_HI + 1})) AS ym
), spine AS (
  SELECT n_nationkey AS nk, CAST(ym AS INT) AS ym FROM nation CROSS JOIN months
), dense AS (
  SELECT spine.nk, spine.ym, COALESCE(rev.y, 0) AS y
  FROM spine LEFT JOIN rev ON spine.nk = rev.nk AND spine.ym = rev.ym
), ncat AS (
  SELECT CAST((COUNT(*) + {FLEISS_CATS - 1}) // {FLEISS_CATS} AS BIGINT) AS per_cat
  FROM nation
), rated AS (
  SELECT nk,
         CAST((ROW_NUMBER() OVER (PARTITION BY ym ORDER BY y DESC, nk ASC) - 1)
              // per_cat AS INTEGER) AS cat
  FROM dense CROSS JOIN ncat
), nij AS (
  SELECT nk, cat, CAST(COUNT(*) AS BIGINT) AS nij FROM rated GROUP BY 1, 2
), subj AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_subjects, CAST(SUM(sq) AS BIGINT) AS ssq
  FROM (SELECT nk, SUM(nij * nij) AS sq FROM nij GROUP BY 1)
), pe AS (
  SELECT SUM(CAST(cj AS DOUBLE) * CAST(cj AS DOUBLE)) AS sum_cj2,
         CAST(SUM(cj) AS BIGINT) AS tot
  FROM (SELECT cat, SUM(nij) AS cj FROM nij GROUP BY 1)
)
SELECT n_subjects, CAST({m} AS BIGINT) AS m_raters,
       (CAST(ssq AS DOUBLE) - CAST(n_subjects AS DOUBLE) * {float(m)!r})
         / (CAST(n_subjects AS DOUBLE) * {float(m)!r} * {float(m - 1)!r}) AS p_bar,
       sum_cj2 / (CAST(tot AS DOUBLE) * CAST(tot AS DOUBLE)) AS p_e,
       ((CAST(ssq AS DOUBLE) - CAST(n_subjects AS DOUBLE) * {float(m)!r})
          / (CAST(n_subjects AS DOUBLE) * {float(m)!r} * {float(m - 1)!r})
        - sum_cj2 / (CAST(tot AS DOUBLE) * CAST(tot AS DOUBLE)))
       / (1.0 - sum_cj2 / (CAST(tot AS DOUBLE) * CAST(tot AS DOUBLE)))
         AS fleiss_kappa
FROM subj CROSS JOIN pe
"""


# ---------------------------------------------------------------------------
# Cochran's Q (round 10 wave 4): k-treatment binary repeated measures
# ---------------------------------------------------------------------------

COCHRAN_Q_YEAR = 1997  # the four "treatments": quarters of one year
COCHRAN_Q_K = 4
# chi-square(df=3) upper 5% critical value — literal, no CDFs (module rule)
COCHRAN_Q_CRIT = 7.814728


def q_cochrans_q_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cochran's Q test: did customer ACTIVITY (placed ≥1 order — a
    binary outcome) differ across the four quarters of {COCHRAN_Q_YEAR}?
    The k-treatment generalization of McNemar (evaluation.py) for binary
    repeated measures on the same subjects — the seasonality test you
    run BEFORE trusting quarter-over-quarter active-user deltas. Q =
    (k−1)·(k·ΣG_j² − T²) / (k·T − ΣL_i²) with G_j = per-quarter active
    counts, L_i = per-customer active-quarter counts, T = ΣG = ΣL;
    subjects inactive all year contribute zero to every sum, so no
    customer-universe join is needed. Degenerate contract: if EVERY
    active subject were active in all k quarters the denominator k·T −
    ΣL² is 0 and Q is NULL on both engines (no variation to test).

    Exactness: every term is an integer count from two hash aggs over
    the distinct (customer, quarter) frame; G_j² is DECIMAL(38,0)
    (G reaches ~10¹² at 100 TB, G² ~ 10²⁴ — past bigint); Q is one
    division; significance is a RATIONAL comparison against the literal
    chi-square critical value (module rule: no CDFs). Scale shape: one
    distinct (≤ 4 rows per customer), two map-side-combinable hash aggs,
    then single-row arithmetic.

    Reference analog: none (engine addition, SURVEY.md §2.7)."""
    orders = load_table(spark, sf_dir, "orders")
    pairs = (
        orders.filter(F.year("o_orderdate") == COCHRAN_Q_YEAR)
        .select("o_custkey", F.quarter("o_orderdate").alias("q"))
        .distinct()
    )
    g = pairs.groupBy("q").agg(F.count(F.lit(1)).cast("long").alias("gj"))
    gm = g.agg(
        F.sum("gj").cast("long").alias("t"),
        F.sum(F.col("gj").cast("decimal(38,0)") * F.col("gj").cast("decimal(38,0)"))
        .cast("decimal(38,0)")
        .alias("sg2"),
    )
    l_ = pairs.groupBy("o_custkey").agg(F.count(F.lit(1)).cast("long").alias("li"))
    lm = l_.agg(
        F.count(F.lit(1)).cast("long").alias("n_subjects"),
        F.sum(F.col("li") * F.col("li")).cast("long").alias("sl2"),
    )
    k = F.lit(float(COCHRAN_Q_K))
    both = gm.crossJoin(F.broadcast(lm))
    td = F.col("t").cast("double")
    num = (k - F.lit(1.0)) * (
        k * F.col("sg2").cast("double") - td * td
    )
    den = k * td - F.col("sl2").cast("double")
    q_stat = num / den
    return both.select(
        F.lit(COCHRAN_Q_K).cast("int").alias("k_quarters"),
        "n_subjects",
        F.col("t").alias("total_active_marks"),
        q_stat.alias("q_stat"),
        F.lit(COCHRAN_Q_K - 1).cast("int").alias("df"),
        (q_stat > F.lit(COCHRAN_Q_CRIT)).cast("int").alias("significant_5pct"),
    )


q_cochrans_q_test.__doc__ = q_cochrans_q_test.__doc__ and q_cochrans_q_test.__doc__.replace(
    "{COCHRAN_Q_YEAR}", str(COCHRAN_Q_YEAR)
)


_ORACLE_COCHRANS_Q = f"""
WITH pairs AS (
  SELECT DISTINCT o_custkey, quarter(o_orderdate) AS q
  FROM orders WHERE year(o_orderdate) = {COCHRAN_Q_YEAR}
), gm AS (
  SELECT CAST(SUM(gj) AS BIGINT) AS t,
         CAST(SUM(CAST(gj AS DECIMAL(38,0)) * CAST(gj AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS sg2
  FROM (SELECT q, CAST(COUNT(*) AS BIGINT) AS gj FROM pairs GROUP BY 1)
), lm AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_subjects,
         CAST(SUM(li * li) AS BIGINT) AS sl2
  FROM (SELECT o_custkey, CAST(COUNT(*) AS BIGINT) AS li FROM pairs GROUP BY 1)
)
SELECT CAST({COCHRAN_Q_K} AS INT) AS k_quarters,
       n_subjects,
       t AS total_active_marks,
       ({COCHRAN_Q_K}.0 - 1.0) * ({COCHRAN_Q_K}.0 * CAST(sg2 AS DOUBLE)
          - CAST(t AS DOUBLE) * CAST(t AS DOUBLE))
         / ({COCHRAN_Q_K}.0 * CAST(t AS DOUBLE) - CAST(sl2 AS DOUBLE)) AS q_stat,
       CAST({COCHRAN_Q_K - 1} AS INT) AS df,
       CAST(CASE WHEN ({COCHRAN_Q_K}.0 - 1.0) * ({COCHRAN_Q_K}.0 * CAST(sg2 AS DOUBLE)
                        - CAST(t AS DOUBLE) * CAST(t AS DOUBLE))
                      / ({COCHRAN_Q_K}.0 * CAST(t AS DOUBLE) - CAST(sl2 AS DOUBLE))
                      > {COCHRAN_Q_CRIT} THEN 1 ELSE 0 END AS INT) AS significant_5pct
FROM gm CROSS JOIN lm
"""


# ---------------------------------------------------------------------------
# Krippendorff's alpha (nominal) — round 10 wave 5
# ---------------------------------------------------------------------------

KRIPP_YEAR = 1997
KRIPP_M = 4  # raters = the four quarters
KRIPP_CATS = 3  # revenue terciles


def q_krippendorff_alpha(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Krippendorff's alpha (nominal) for the quarter-by-quarter tercile
    rating of nations — the agreement coefficient built on DISAGREEMENT
    rates rather than chance-corrected hit rates, which makes it the one
    that generalizes across missing data, many raters, and every metric
    level (the de-facto standard in content analysis and LLM-judge
    calibration). Here: each of the m={m} quarters of {y} "rates" every
    nation into a revenue tercile (within-quarter competition rank on
    the zero-filled nation×quarter grid, nationkey tie-break); alpha =
    1 − D_o/D_e with D_o = Σ_u Σ_c n_uc(m − n_uc)/(N(m−1)) and D_e =
    Σ_c N_c(N − N_c)/(N(N−1)) — entirely INTEGER until two divisions,
    the module's no-transcendentals contract natively.

    Complements ``fleiss_kappa`` (whose chance model uses the marginal
    proportions multiplicatively): alpha's disagreement form differs at
    small N (the (N−1) correction) — shipping both is exactly how a
    rater-reliability audit cross-checks its conclusion.

    Scale shape: one data-sized orders⋈customer hash agg to the
    |nations|×{m} grid; ranks/counts/sums all domain-sized after."""
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    nation = load_table(spark, sf_dir, "nation").select("n_nationkey")
    rev = (
        orders.filter(F.year("o_orderdate") == KRIPP_YEAR)
        .join(cust, orders["o_custkey"] == cust["c_custkey"])
        .groupBy(
            F.col("c_nationkey").alias("nk"),
            F.quarter("o_orderdate").alias("q"),
        )
        .agg(
            F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("bigint"))
            .cast("long")
            .alias("cents")
        )
    )
    quarters = spark.range(1, KRIPP_M + 1).select(F.col("id").cast("int").alias("q"))
    spine = nation.crossJoin(F.broadcast(quarters)).select(
        F.col("n_nationkey").alias("nk"), "q"
    )
    grid = spine.join(rev, ["nk", "q"], "left").select(
        "nk", "q", F.coalesce(F.col("cents"), F.lit(0)).cast("long").alias("cents")
    )
    w = Window.partitionBy("q").orderBy(F.col("cents").desc(), F.col("nk").asc())
    wn = Window.partitionBy("q")
    rated = grid.select(
        "nk",
        F.floor(
            (F.lit(KRIPP_CATS) * (F.row_number().over(w) - F.lit(1)))
            / F.count(F.lit(1)).over(wn)
        )
        .cast("int")
        .alias("cat"),
    )
    nuc = rated.groupBy("nk", "cat").agg(F.count(F.lit(1)).cast("long").alias("n_uc"))
    do_num = nuc.agg(
        F.sum(F.col("n_uc") * (F.lit(KRIPP_M) - F.col("n_uc")))
        .cast("long")
        .alias("do_num"),
        F.countDistinct("nk").cast("long").alias("n_units"),
    )
    nc = nuc.groupBy("cat").agg(F.sum("n_uc").cast("long").alias("n_c"))
    ntot = nc.agg(F.sum("n_c").cast("long").alias("n_total"))
    de_num = (
        nc.crossJoin(F.broadcast(ntot))
        .agg(
            F.sum(
                F.col("n_c").cast("decimal(38,0)")
                * (F.col("n_total") - F.col("n_c")).cast("decimal(38,0)")
            )
            .cast("decimal(38,0)")
            .alias("de_num"),
            F.max("n_total").alias("n_total"),
        )
    )
    both = do_num.crossJoin(F.broadcast(de_num))
    nd = F.col("n_total").cast("double")
    d_o = F.col("do_num").cast("double") / (nd * F.lit(float(KRIPP_M - 1)))
    d_e = F.col("de_num").cast("double") / (nd * (nd - F.lit(1.0)))
    return both.select(
        "n_units",
        F.lit(KRIPP_M).cast("int").alias("m_raters"),
        "n_total",
        d_o.alias("d_observed"),
        d_e.alias("d_expected"),
        (F.lit(1.0) - d_o / d_e).alias("alpha"),
    )
q_krippendorff_alpha.__doc__ = q_krippendorff_alpha.__doc__ and q_krippendorff_alpha.__doc__.format(
        m=KRIPP_M, y=KRIPP_YEAR
    )


def _sql_krippendorff() -> str:
    return f"""
WITH rev AS (
  SELECT c_nationkey AS nk, quarter(o_orderdate) AS q,
         CAST(SUM(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT) AS cents
  FROM orders JOIN customer ON o_custkey = c_custkey
  WHERE year(o_orderdate) = {KRIPP_YEAR}
  GROUP BY 1, 2
), spine AS (
  SELECT n_nationkey AS nk, CAST(qq AS INT) AS q
  FROM nation CROSS JOIN (SELECT UNNEST(range(1, {KRIPP_M + 1})) AS qq)
), grid AS (
  SELECT spine.nk, spine.q, CAST(COALESCE(rev.cents, 0) AS BIGINT) AS cents
  FROM spine LEFT JOIN rev ON spine.nk = rev.nk AND spine.q = rev.q
), rated AS (
  SELECT nk,
         CAST(floor(({KRIPP_CATS} * (ROW_NUMBER() OVER (PARTITION BY q ORDER BY cents DESC, nk ASC) - 1))
              / COUNT(*) OVER (PARTITION BY q)) AS INT) AS cat
  FROM grid
), nuc AS (
  SELECT nk, cat, CAST(COUNT(*) AS BIGINT) AS n_uc FROM rated GROUP BY 1, 2
), do_t AS (
  SELECT CAST(SUM(n_uc * ({KRIPP_M} - n_uc)) AS BIGINT) AS do_num,
         CAST(COUNT(DISTINCT nk) AS BIGINT) AS n_units
  FROM nuc
), nc AS (
  SELECT cat, CAST(SUM(n_uc) AS BIGINT) AS n_c FROM nuc GROUP BY 1
), de_t AS (
  SELECT CAST(SUM(CAST(n_c AS DECIMAL(38,0))
               * CAST((SELECT SUM(n_c) FROM nc) - n_c AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS de_num,
         CAST(SUM(n_c) AS BIGINT) AS n_total
  FROM nc
)
SELECT n_units,
       CAST({KRIPP_M} AS INT) AS m_raters,
       n_total,
       CAST(do_num AS DOUBLE) / (CAST(n_total AS DOUBLE) * {float(KRIPP_M - 1)!r})
         AS d_observed,
       CAST(de_num AS DOUBLE) / (CAST(n_total AS DOUBLE) * (CAST(n_total AS DOUBLE) - 1.0))
         AS d_expected,
       1.0 - (CAST(do_num AS DOUBLE) / (CAST(n_total AS DOUBLE) * {float(KRIPP_M - 1)!r}))
           / (CAST(de_num AS DOUBLE) / (CAST(n_total AS DOUBLE) * (CAST(n_total AS DOUBLE) - 1.0)))
         AS alpha
FROM do_t CROSS JOIN de_t
"""


# ---------------------------------------------------------------------------
# Quade test — round 10 wave 5
# ---------------------------------------------------------------------------

QUADE_YEAR = 1997
QUADE_K = 4  # treatments = quarters
# F(3, 72) upper 5% critical value for b=25 blocks, k=4 — literal
QUADE_F_CRIT = 2.731807
# the critical value above is ONLY valid at b=25: guard significant_5pct
# on the measured block count (NULL otherwise), mirroring dixon_q_outlier
QUADE_B = 25


def q_quade_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quade test: do the four quarters of {y} differ in nation revenue,
    WEIGHTING nations by how much their revenue actually moves? The
    range-weighted sibling of Friedman/``kendalls_w``: within-block
    ranks r_ij are multiplied by the block's RANGE rank Q_i, so
    high-variation nations (where a treatment effect is visible) drive
    the statistic and flat blocks stop diluting it — the recommended
    test for small k with heterogeneous blocks (Conover). F =
    (b−1)·B/(A−B) on S_ij = Q_i·(r_ij − (k+1)/2).

    Exact-integer formulation: DOUBLED midranks dr (within-block, over
    the zero-filled nation×quarter grid) and DOUBLED range midranks dQ
    keep every term integral — A·16 = Σ(dQ(dr−5))² and B·16b = ΣT_j²
    with T_j = Σ_i dQ_i(dr_ij−5), so F = (b−1)·ΣT_j² / (b·Σ(dQ(dr−5))²
    − ΣT_j²) is ONE division on exact integers. Significance compares
    against the literal F(k−1,(b−1)(k−1)) 5% critical value (module
    rule: no CDFs); the literal is only valid at b=QUADE_B blocks, so
    significant_5pct is guarded NULL when the measured block count
    drifts (the dixon_q_outlier pattern).

    Scale shape: one data-sized hash agg to the grid; ranks, ranges,
    and both sums are domain-sized (≤ b·k rows)."""
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    nation = load_table(spark, sf_dir, "nation").select("n_nationkey")
    rev = (
        orders.filter(F.year("o_orderdate") == QUADE_YEAR)
        .join(cust, orders["o_custkey"] == cust["c_custkey"])
        .groupBy(
            F.col("c_nationkey").alias("nk"),
            F.quarter("o_orderdate").alias("q"),
        )
        .agg(
            F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("bigint"))
            .cast("long")
            .alias("cents")
        )
    )
    quarters = spark.range(1, QUADE_K + 1).select(F.col("id").cast("int").alias("q"))
    spine = nation.crossJoin(F.broadcast(quarters)).select(
        F.col("n_nationkey").alias("nk"), "q"
    )
    grid = spine.join(rev, ["nk", "q"], "left").select(
        "nk", "q", F.coalesce(F.col("cents"), F.lit(0)).cast("long").alias("cents")
    )
    # doubled within-block midranks: dr = 2*min_rank + (ties - 1)
    w_rank = Window.partitionBy("nk").orderBy("cents")
    w_ties = Window.partitionBy("nk", "cents")
    ranked = grid.select(
        "nk",
        "q",
        "cents",
        (F.lit(2) * F.rank().over(w_rank) + F.count(F.lit(1)).over(w_ties) - F.lit(1))
        .cast("long")
        .alias("dr"),
    )
    # doubled block-range midranks over the b-row range frame
    ranges = ranked.groupBy("nk").agg(
        (F.max("cents") - F.min("cents")).cast("long").alias("rng")
    )
    w_q = Window.orderBy("rng")
    w_qt = Window.partitionBy("rng")
    blocks = ranges.select(
        "nk",
        (F.lit(2) * F.rank().over(w_q) + F.count(F.lit(1)).over(w_qt) - F.lit(1))
        .cast("long")
        .alias("dq"),
    )
    s_frame = ranked.join(blocks, "nk").select(
        "q",
        (F.col("dq") * (F.col("dr") - F.lit(QUADE_K + 1))).cast("long").alias("s16"),
    )
    a16 = s_frame.agg(
        F.sum(F.col("s16") * F.col("s16")).cast("decimal(38,0)").alias("a16"),
        F.countDistinct("q").cast("long").alias("k_t"),
    )
    tj = s_frame.groupBy("q").agg(F.sum("s16").cast("long").alias("t_j"))
    b16b = tj.agg(
        F.sum(F.col("t_j").cast("decimal(38,0)") * F.col("t_j").cast("decimal(38,0)"))
        .cast("decimal(38,0)")
        .alias("b16b")
    )
    nb = blocks.agg(F.count(F.lit(1)).cast("long").alias("b"))
    both = a16.crossJoin(F.broadcast(b16b)).crossJoin(F.broadcast(nb))
    bd = F.col("b").cast("double")
    f_stat = (
        (bd - F.lit(1.0))
        * F.col("b16b").cast("double")
        / (bd * F.col("a16").cast("double") - F.col("b16b").cast("double"))
    )
    sig = F.when(
        F.col("b") == F.lit(QUADE_B),
        (f_stat > F.lit(QUADE_F_CRIT)).cast("int"),
    ).otherwise(F.lit(None).cast("int"))
    return both.select(
        F.col("b").alias("n_blocks"),
        F.lit(QUADE_K).cast("int").alias("k_treatments"),
        f_stat.alias("f_stat"),
        sig.alias("significant_5pct"),
    )
q_quade_test.__doc__ = q_quade_test.__doc__ and q_quade_test.__doc__.format(y=QUADE_YEAR)


def _sql_quade() -> str:
    return f"""
WITH rev AS (
  SELECT c_nationkey AS nk, quarter(o_orderdate) AS q,
         CAST(SUM(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT) AS cents
  FROM orders JOIN customer ON o_custkey = c_custkey
  WHERE year(o_orderdate) = {QUADE_YEAR}
  GROUP BY 1, 2
), spine AS (
  SELECT n_nationkey AS nk, CAST(qq AS INT) AS q
  FROM nation CROSS JOIN (SELECT UNNEST(range(1, {QUADE_K + 1})) AS qq)
), grid AS (
  SELECT spine.nk, spine.q, CAST(COALESCE(rev.cents, 0) AS BIGINT) AS cents
  FROM spine LEFT JOIN rev ON spine.nk = rev.nk AND spine.q = rev.q
), ranked AS (
  SELECT nk, q, cents,
         CAST(2 * RANK() OVER (PARTITION BY nk ORDER BY cents)
              + COUNT(*) OVER (PARTITION BY nk, cents) - 1 AS BIGINT) AS dr
  FROM grid
), ranges AS (
  SELECT nk, CAST(MAX(cents) - MIN(cents) AS BIGINT) AS rng
  FROM ranked GROUP BY 1
), blocks AS (
  SELECT nk,
         CAST(2 * RANK() OVER (ORDER BY rng)
              + COUNT(*) OVER (PARTITION BY rng) - 1 AS BIGINT) AS dq
  FROM ranges
), s_frame AS (
  SELECT q, CAST(dq * (dr - {QUADE_K + 1}) AS BIGINT) AS s16
  FROM ranked JOIN blocks USING (nk)
), a16 AS (
  SELECT CAST(SUM(CAST(s16 AS DECIMAL(38,0)) * CAST(s16 AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS a16
  FROM s_frame
), tj AS (
  SELECT q, CAST(SUM(s16) AS BIGINT) AS t_j FROM s_frame GROUP BY 1
), b16b AS (
  SELECT CAST(SUM(CAST(t_j AS DECIMAL(38,0)) * CAST(t_j AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS b16b
  FROM tj
), nb AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS b FROM blocks
)
SELECT b AS n_blocks,
       CAST({QUADE_K} AS INT) AS k_treatments,
       (CAST(b AS DOUBLE) - 1.0) * CAST(b16b AS DOUBLE)
         / (CAST(b AS DOUBLE) * CAST(a16 AS DOUBLE) - CAST(b16b AS DOUBLE)) AS f_stat,
       CAST(CASE WHEN b <> {QUADE_B} THEN NULL
                 WHEN (CAST(b AS DOUBLE) - 1.0) * CAST(b16b AS DOUBLE)
                      / (CAST(b AS DOUBLE) * CAST(a16 AS DOUBLE) - CAST(b16b AS DOUBLE))
                      > {QUADE_F_CRIT} THEN 1 ELSE 0 END AS INT) AS significant_5pct
FROM a16 CROSS JOIN b16b CROSS JOIN nb
"""


# ---------------------------------------------------------------------------
# Conover squared-ranks test (round 12)
# ---------------------------------------------------------------------------

_CONOVER_FLAGS = ["A", "N", "R"]
# chi-square 0.95 quantile, df = k-1 = 2 (Python-precomputed literal, the
# same critical-value convention as kruskal/quade)
_CONOVER_CHI2_CRIT_DF2 = "5.991464547107979e0"


def q_conover_squared_ranks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conover squared-ranks test for equal SCALE across the three return
    flags on lineitem quantity — the RANK-based k-sample dispersion test
    (Conover 1999 §5.3), completing the scale-test ladder beside
    ``levene_brown_forsythe`` (moment-based k-sample, same data, so the
    two are directly comparable) and ``ansari_bradley_scale`` (rank-based
    but two-sample): ranks of |x − median(group)| are squared, so the
    statistic keys on dispersion while the rank transform discards the
    heavy tails Levene's raw moments absorb.

    Exact-integer formulation: the group median is the exact lower-median
    pick ((n+1) DIV 2 — same idiom as Brown-Forsythe), deviations
    z = |qty − med_g| are small integers, and the squared midranks use
    the DOUBLED-rank identity: per distinct deviation with t predecessors
    and c tied rows, A = (2t+c+1)² is an exact integer equal to 4·(the
    squared midrank), and Conover's T is algebraically invariant under
    that ×4 scaling. All sums (S_g = Σc_g·A, ΣcA, ΣcA²) are exact
    DECIMAL(38,0) (ΣcA² ≤ 16N⁵ — inside DECIMAL(38,0) through ~sf7;
    past that, pre-bucket deviations). These moments exceed 2^64, where
    a bare decimal→double CAST is no longer engine-identical (measured
    live on THIS statistic: DuckDB's int128 two-step conversion read
    1 ulp off the JVM's, and the cancellation in T amplified it to a
    2-ulp hash mismatch) — every conversion therefore goes through the
    portable limb-split ``functions/exact.dec_to_double``. T =
    (Σ_g S_g²/n_g − (ΣcA)²/N) / [(ΣcA² − (ΣcA)²/N)/(N−1)] ~ χ²(k−1)
    is then ONE fixed-order IEEE expression on engine-identical doubles;
    the 5% flag compares against the Python-literal χ²₀.₉₅(2).
    Degenerate contract: all deviations equal
    (zero rank variance, D²=0) → t_stat/flag NULL under an explicit
    guard.

    Scale shape: one per-group sort window for medians, one deviation-
    domain hash agg (≤50 distinct deviations), the ``_cum_prev``
    bucketed cumulative, one 1-row reduce — same shape as
    ``kruskal_wallis``."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag", F.col("l_quantity").cast("long").alias("qty")
    )
    w = Window.partitionBy("l_returnflag").orderBy("qty")
    ranked = li.select(
        "l_returnflag",
        "qty",
        F.row_number().over(w).alias("rk"),
        F.count(F.lit(1)).over(Window.partitionBy("l_returnflag")).alias("cnt"),
    )
    med = ranked.filter(F.col("rk") == F.expr("(cnt + 1) DIV 2")).select(
        "l_returnflag", F.col("qty").alias("med")
    )
    devs = li.join(F.broadcast(med), "l_returnflag").select(
        "l_returnflag", F.abs(F.col("qty") - F.col("med")).alias("dev")
    )
    per_d = devs.groupBy("dev").agg(
        *[
            F.sum(F.when(F.col("l_returnflag") == f, 1).otherwise(0)).alias(
                f"c_{f}"
            )
            for f in _CONOVER_FLAGS
        ]
    )
    c_tot = sum(
        (F.col(f"c_{f}") for f in _CONOVER_FLAGS[1:]), F.col(f"c_{_CONOVER_FLAGS[0]}")
    )
    per_d = per_d.select(
        "dev", *[f"c_{f}" for f in _CONOVER_FLAGS], c_tot.alias("c")
    )
    rankedd = _cum_prev(per_d, ["dev"], {"t": F.col("c")}, materialize=True).select(
        *[f"c_{f}" for f in _CONOVER_FLAGS],
        "c",
        "t",
    )
    a_int = (F.lit(2) * F.col("t") + F.col("c") + F.lit(1)) * (
        F.lit(2) * F.col("t") + F.col("c") + F.lit(1)
    )
    a_dec = a_int.cast("decimal(38,0)")
    aggs = [
        F.sum("c").cast("long").alias("n_rows"),
        F.sum(F.col("c").cast("decimal(38,0)") * a_dec)
        .cast("decimal(38,0)")
        .alias("sum_a"),
        F.sum(F.col("c").cast("decimal(38,0)") * a_dec * a_dec)
        .cast("decimal(38,0)")
        .alias("sum_a2"),
    ]
    for f in _CONOVER_FLAGS:
        aggs.append(F.sum(f"c_{f}").cast("long").alias(f"n_{f}"))
        aggs.append(
            F.sum(F.col(f"c_{f}").cast("decimal(38,0)") * a_dec)
            .cast("decimal(38,0)")
            .alias(f"s_{f}")
        )
    red = rankedd.agg(*aggs)
    nd = F.col("n_rows").cast("double")

    # ΣcA / ΣcA² / per-group ΣcA exceed 2^64 well inside the data range,
    # so every decimal→double conversion here goes through the portable
    # limb-split (a bare cast measured 1 ulp off between engines on this
    # very statistic — see functions/exact.dec_to_double)
    def term(f: str):
        s = dec_to_double(F.col(f"s_{f}"))
        return s * s / F.col(f"n_{f}").cast("double")

    terms = sum((term(f) for f in _CONOVER_FLAGS[1:]), term(_CONOVER_FLAGS[0]))
    sad = dec_to_double(F.col("sum_a"))
    meanterm = sad * sad / nd
    num = terms - meanterm
    d2 = (dec_to_double(F.col("sum_a2")) - meanterm) / (nd - F.lit(1.0))
    t_stat = F.when(d2 > 0, num / d2).otherwise(F.lit(None).cast("double"))
    return red.select(
        "n_rows",
        t_stat.alias("t_stat"),
        F.lit(len(_CONOVER_FLAGS) - 1).cast("int").alias("df"),
        F.when(
            d2 > 0,
            (num / d2 > F.lit(float(_CONOVER_CHI2_CRIT_DF2))).cast("int"),
        )
        .otherwise(F.lit(None).cast("int"))
        .alias("significant_5pct"),
    )


def _sql_conover() -> str:
    c_cols = ",\n         ".join(
        f"SUM(CASE WHEN l_returnflag = '{f}' THEN 1 ELSE 0 END) AS c_{f}"
        for f in _CONOVER_FLAGS
    )
    c_tot = " + ".join(f"c_{f}" for f in _CONOVER_FLAGS)
    n_cols = ", ".join(
        f"CAST(SUM(c_{f}) AS BIGINT) AS n_{f}" for f in _CONOVER_FLAGS
    )
    s_cols = ", ".join(
        f"CAST(SUM(CAST(c_{f} AS DECIMAL(38,0)) * a_dec) AS DECIMAL(38,0)) AS s_{f}"
        for f in _CONOVER_FLAGS
    )
    terms = " + ".join(
        f"{sql_dec_to_double(f's_{f}')} * {sql_dec_to_double(f's_{f}')}"
        f" / CAST(n_{f} AS DOUBLE)"
        for f in _CONOVER_FLAGS
    )
    return f"""
WITH li AS (
  SELECT l_returnflag, CAST(l_quantity AS BIGINT) AS qty FROM lineitem
), ranked AS (
  SELECT l_returnflag, qty,
         ROW_NUMBER() OVER (PARTITION BY l_returnflag ORDER BY qty) AS rk,
         COUNT(*) OVER (PARTITION BY l_returnflag) AS cnt
  FROM li
), med AS (
  SELECT l_returnflag, qty AS med FROM ranked WHERE rk = (cnt + 1) // 2
), devs AS (
  SELECT li.l_returnflag, ABS(li.qty - med.med) AS dev
  FROM li JOIN med ON li.l_returnflag = med.l_returnflag
), per_d AS (
  SELECT dev,
         {c_cols}
  FROM devs GROUP BY 1
), rankedd AS (
  SELECT *, {c_tot} AS c,
         COALESCE(SUM({c_tot}) OVER (ORDER BY dev
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS t
  FROM per_d
), adec AS (
  SELECT *, CAST((2 * t + c + 1) * (2 * t + c + 1) AS DECIMAL(38,0)) AS a_dec
  FROM rankedd
), red AS (
  SELECT CAST(SUM(c) AS BIGINT) AS n_rows,
         CAST(SUM(CAST(c AS DECIMAL(38,0)) * a_dec) AS DECIMAL(38,0)) AS sum_a,
         CAST(SUM(CAST(c AS DECIMAL(38,0)) * a_dec * a_dec) AS DECIMAL(38,0)) AS sum_a2,
         {n_cols},
         {s_cols}
  FROM adec
), fin AS (
  SELECT n_rows,
         CAST(n_rows AS DOUBLE) AS nd,
         {terms} AS terms,
         {sql_dec_to_double("sum_a")} * {sql_dec_to_double("sum_a")}
           / CAST(n_rows AS DOUBLE) AS meanterm,
         {sql_dec_to_double("sum_a2")} AS sa2
  FROM red
)
SELECT n_rows,
       CASE WHEN (sa2 - meanterm) / (nd - 1.0) > 0
            THEN (terms - meanterm) / ((sa2 - meanterm) / (nd - 1.0)) END AS t_stat,
       CAST({len(_CONOVER_FLAGS) - 1} AS INT) AS df,
       CASE WHEN (sa2 - meanterm) / (nd - 1.0) > 0
            THEN CAST((terms - meanterm) / ((sa2 - meanterm) / (nd - 1.0))
                      > {_CONOVER_CHI2_CRIT_DF2} AS INT) END AS significant_5pct
FROM fin
"""


# ---------------------------------------------------------------------------
# Gwet's AC1 (round 12)
# ---------------------------------------------------------------------------


def q_gwet_ac1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gwet's AC1 between the SAME two document classifiers as
    ``cohens_kappa`` (chars-threshold vs tokens-threshold raters) — the
    agreement coefficient built to escape the KAPPA PARADOX: when the
    'yes' margin is skewed, kappa's independence-based chance term p_e
    approaches p_o and kappa collapses toward 0 even for raters that
    almost always agree; AC1's chance term 2π(1−π) (π = mean marginal
    'yes' share; Gwet 2008) models chance agreement as maximal at
    π = ½ and vanishing at the margins, so it stays interpretable on
    skewed labels — the modern QA default beside kappa, reported here
    WITH the same-cells kappa and the paradox gap so the contrast is a
    single row.

    Exactness: the same 2×2 integer cells as cohens_kappa (one hash
    agg); pa, π, pe, AC1, kappa are one fixed IEEE sequence on them.
    Degenerate contract: KAPPA's denominator can vanish (pe_k = 1 when
    both raters are constant) → kappa NULL under its explicit guard.
    AC1's chance term 2π(1−π) is bounded by ½ (max at π = ½, 0 at
    π ∈ {0,1}), so its 1 − pe_ac1 denominator NEVER vanishes — the
    mirrored pe_ac1 < 1 guard is structurally unreachable and kept only
    for shape symmetry with kappa (ADVICE r12 doc audit).

    Scale: one map-side-combinable aggregate → 1-row arithmetic.

    Reference analog: none (engine addition, SURVEY.md §2.7)."""
    docs = load_table(spark, sf_dir, "documents")
    a = (F.col("n_chars") >= KAPPA_CHARS).cast("int")
    b = (
        F.size(F.filter(F.split(F.col("text"), " "), lambda t: t != ""))
        >= KAPPA_TOKENS
    ).cast("int")
    m = docs.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(a * b).cast("long").alias("yy"),
        F.sum(a * (1 - b)).cast("long").alias("yn"),
        F.sum((1 - a) * b).cast("long").alias("ny"),
        F.sum((1 - a) * (1 - b)).cast("long").alias("nn"),
    )
    nd = F.col("n").cast("double")
    pa = (F.col("yy") + F.col("nn")).cast("double") / nd
    pi = (
        (F.col("yy") + F.col("yn")).cast("double")
        + (F.col("yy") + F.col("ny")).cast("double")
    ) / (F.lit(2.0) * nd)
    pe_ac1 = F.lit(2.0) * pi * (F.lit(1.0) - pi)
    pe_k = (
        (F.col("yy") + F.col("yn")).cast("double")
        * (F.col("yy") + F.col("ny")).cast("double")
        + (F.col("ny") + F.col("nn")).cast("double")
        * (F.col("yn") + F.col("nn")).cast("double")
    ) / (nd * nd)
    ac1 = F.when(pe_ac1 < 1.0, (pa - pe_ac1) / (F.lit(1.0) - pe_ac1))
    kap = F.when(pe_k < 1.0, (pa - pe_k) / (F.lit(1.0) - pe_k))
    return m.select(
        "n",
        pa.alias("p_observed"),
        pi.alias("pi_yes"),
        ac1.alias("gwet_ac1"),
        kap.alias("kappa_same_cells"),
        (ac1 - kap).alias("paradox_gap"),
    )


def _sql_gwet_ac1() -> str:
    return f"""
WITH cells AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(a * b) AS BIGINT) AS yy,
         CAST(SUM(a * (1 - b)) AS BIGINT) AS yn,
         CAST(SUM((1 - a) * b) AS BIGINT) AS ny,
         CAST(SUM((1 - a) * (1 - b)) AS BIGINT) AS nn
  FROM (
    SELECT CASE WHEN n_chars >= {KAPPA_CHARS} THEN 1 ELSE 0 END AS a,
           CASE WHEN len(list_filter(string_split(text, ' '), t -> t <> '')) >= {KAPPA_TOKENS}
                THEN 1 ELSE 0 END AS b
    FROM documents
  )
), fin AS (
  SELECT n, CAST(n AS DOUBLE) AS nd,
         CAST(yy + nn AS DOUBLE) / CAST(n AS DOUBLE) AS pa,
         (CAST(yy + yn AS DOUBLE) + CAST(yy + ny AS DOUBLE)) / (2.0 * CAST(n AS DOUBLE)) AS pi,
         (CAST(yy + yn AS DOUBLE) * CAST(yy + ny AS DOUBLE)
          + CAST(ny + nn AS DOUBLE) * CAST(yn + nn AS DOUBLE))
           / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)) AS pe_k
  FROM cells
)
SELECT n, pa AS p_observed, pi AS pi_yes,
       CASE WHEN 2.0 * pi * (1.0 - pi) < 1.0
            THEN (pa - 2.0 * pi * (1.0 - pi)) / (1.0 - 2.0 * pi * (1.0 - pi)) END AS gwet_ac1,
       CASE WHEN pe_k < 1.0 THEN (pa - pe_k) / (1.0 - pe_k) END AS kappa_same_cells,
       (CASE WHEN 2.0 * pi * (1.0 - pi) < 1.0
             THEN (pa - 2.0 * pi * (1.0 - pi)) / (1.0 - 2.0 * pi * (1.0 - pi)) END)
       - (CASE WHEN pe_k < 1.0 THEN (pa - pe_k) / (1.0 - pe_k) END) AS paradox_gap
FROM fin
"""


# ---------------------------------------------------------------------------
# Breslow-Day homogeneity-of-odds-ratios test (round 13)
# ---------------------------------------------------------------------------

_BD_CHI2_CRIT_4DF = 9.487729036781154  # chi2(k-1 = 4) 5%, Python-folded


def _bd_tree() -> dict[str, str]:
    """Breslow-Day as ONE shared expression text (F.expr + oracle) over
    per-stratum columns a{i}, m1{i} (exposed margin), t1{i} (case
    margin), m0{i} (unexposed margin) and the pooled psi: per stratum
    the expected a-cell under the common OR solves the quadratic
    (ψ−1)Ẽ² − [ψ(m1+t1) + (m0−t1)]Ẽ + ψ·m1·t1 = 0 with the root chosen
    INSIDE the admissible interval (max(0, t1−m0), min(m1, t1)); the
    variance is the harmonic combination of the four fitted cells, and
    BD = Σ (a−Ẽ)²/V in fixed left-to-right stratum order."""
    mh_num = " + ".join(f"u{i}" for i in range(len(_SEGMENTS)))
    mh_den = " + ".join(f"v{i}" for i in range(len(_SEGMENTS)))
    psi = f"(({mh_num}) / ({mh_den}))"
    # per-stratum fitted cells reference a NAMED `psi` column (computed
    # once in its own projection), and the BD sum references NAMED e{i}
    # columns — keeps every generated expression small enough for
    # whole-stage codegen (the fully-inlined form blew the 64KB Janino
    # method limit, measured live on the first gate run)
    e_cols = []
    terms = []
    for i in range(len(_SEGMENTS)):
        m1d = f"CAST(cm1{i} AS DOUBLE)"
        t1d = f"CAST(ct1{i} AS DOUBLE)"
        m0d = f"CAST(cm0{i} AS DOUBLE)"
        qa = "(psi - 1.0)"
        qb = f"(-(psi * ({m1d} + {t1d}) + ({m0d} - {t1d})))"
        qc = f"(psi * {m1d} * {t1d})"
        disc = f"sqrt({qb} * {qb} - 4.0 * {qa} * {qc})"
        r1 = f"((-{qb} + {disc}) / (2.0 * {qa}))"
        r2 = f"((-{qb} - {disc}) / (2.0 * {qa}))"
        lo = f"GREATEST(0.0, {t1d} - {m0d})"
        hi = f"LEAST({m1d}, {t1d})"
        e_cols.append(
            f"(CASE WHEN {r2} > {lo} AND {r2} < {hi} THEN {r2} ELSE {r1} END)"
        )
        v = (
            f"(1.0 / (1.0 / e{i} + 1.0 / ({m1d} - e{i}) + 1.0 / ({t1d} - e{i})"
            f" + 1.0 / ({m0d} - {t1d} + e{i})))"
        )
        dev = f"(CAST(ca{i} AS DOUBLE) - e{i})"
        terms.append(f"({dev} * {dev} / {v})")
    bd = "(" + " + ".join(terms) + ")"
    ok = " AND ".join(
        f"cm1{i} > 0 AND ct1{i} > 0 AND cm0{i} > 0 AND cm1{i} + cm0{i} > ct1{i}"
        for i in range(len(_SEGMENTS))
    )
    return {"psi": psi, "e": e_cols, "bd": bd, "ok": ok}


def q_breslow_day_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Breslow-Day test of ODDS-RATIO HOMOGENEITY across the five
    market-segment strata — the companion question to
    ``mantel_haenszel_or`` (same 2×2 tables: high-balance exposure ×
    urgent outcome): MH pools the per-stratum ORs into one number, BD
    asks whether pooling is even LEGITIMATE (Breslow & Day 1980,
    §IV.4). BD = Σ_s (a_s − Ẽ_s)²/V_s ~ χ²(k−1) under a common OR,
    where Ẽ_s is the fitted a-cell under the MH estimate ψ: the
    admissible root of the quadratic (ψ−1)Ẽ² − [ψ(m1+t1)+(m0−t1)]Ẽ +
    ψ·m1·t1 = 0, and 1/V_s is the harmonic sum of the four fitted
    cells.

    Exactness: cells/margins are exact integer counts from ONE hash
    agg, pivoted onto the LITERAL five-segment domain (fixed columns —
    the module discipline); ψ, every quadratic root (one sqrt each)
    and the k-term BD sum are a SINGLE shared expression text
    evaluated by F.expr and the oracle — identical text, identical
    IEEE tree, engine-identical doubles. Significance vs the literal
    χ²(4) cut. Degenerate contract: any stratum with an empty margin
    (no exposed, no cases, no unexposed, or all-cases) → BD NULL
    under an explicit guard mirrored in the oracle.

    Scale shape: one orders⋈customer equi-join, one conditional-count
    hash agg to ≤5 rows, one 1-row literal-domain reduction —
    identical to mantel_haenszel_or.

    Reference analog: none (engine addition, SURVEY.md §2.7)."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderpriority"
    )
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment", "c_acctbal"
    )
    j = orders.join(cust, orders["o_custkey"] == cust["c_custkey"])
    e = (F.col("c_acctbal") > F.lit(MH_BAL_THRESHOLD)).cast("int")
    d = (F.col("o_orderpriority") == "1-URGENT").cast("int")
    cells = j.groupBy("c_mktsegment").agg(
        F.sum(e * d).cast("long").alias("a"),
        F.sum(e * (1 - d)).cast("long").alias("b"),
        F.sum((1 - e) * d).cast("long").alias("c"),
        F.sum((1 - e) * (1 - d)).cast("long").alias("dd"),
    )
    nd = (F.col("a") + F.col("b") + F.col("c") + F.col("dd")).cast("double")
    num_t = F.col("a").cast("double") * F.col("dd").cast("double") / nd
    den_t = F.col("b").cast("double") * F.col("c").cast("double") / nd
    aggs = [
        F.sum(F.col("a") + F.col("b") + F.col("c") + F.col("dd"))
        .cast("long")
        .alias("n_rows"),
    ]
    for i, seg in enumerate(_SEGMENTS):
        m = F.col("c_mktsegment") == seg
        aggs.append(F.max(F.when(m, num_t)).alias(f"u{i}"))
        aggs.append(F.max(F.when(m, den_t)).alias(f"v{i}"))
        aggs.append(F.max(F.when(m, F.col("a"))).cast("long").alias(f"ca{i}"))
        aggs.append(
            F.max(F.when(m, F.col("a") + F.col("b"))).cast("long").alias(f"cm1{i}")
        )
        aggs.append(
            F.max(F.when(m, F.col("a") + F.col("c"))).cast("long").alias(f"ct1{i}")
        )
        aggs.append(
            F.max(F.when(m, F.col("c") + F.col("dd")))
            .cast("long")
            .alias(f"cm0{i}")
        )
    red = cells.agg(*aggs)
    t = _bd_tree()
    staged = red.withColumn("psi", F.expr(t["psi"]))
    for i, e_sql in enumerate(t["e"]):
        staged = staged.withColumn(f"e{i}", F.expr(e_sql))
    ok = F.expr(t["ok"])
    return staged.select(
        "n_rows",
        F.col("psi").alias("mh_or"),
        F.when(ok, F.expr(t["bd"])).alias("bd_stat"),
        F.when(
            ok, (F.expr(t["bd"]) > F.lit(_BD_CHI2_CRIT_4DF)).cast("int")
        ).alias("heterogeneous_5pct"),
    )


def _sql_breslow_day() -> str:
    t = _bd_tree()
    seg_cols = []
    for i, seg in enumerate(_SEGMENTS):
        m = f"c_mktsegment = '{seg}'"
        seg_cols.append(
            f"MAX(CASE WHEN {m} THEN CAST(a AS DOUBLE) * CAST(dd AS DOUBLE)"
            f" / CAST(a + b + c + dd AS DOUBLE) END) AS u{i}"
        )
        seg_cols.append(
            f"MAX(CASE WHEN {m} THEN CAST(b AS DOUBLE) * CAST(c AS DOUBLE)"
            f" / CAST(a + b + c + dd AS DOUBLE) END) AS v{i}"
        )
        seg_cols.append(f"CAST(MAX(CASE WHEN {m} THEN a END) AS BIGINT) AS ca{i}")
        seg_cols.append(
            f"CAST(MAX(CASE WHEN {m} THEN a + b END) AS BIGINT) AS cm1{i}"
        )
        seg_cols.append(
            f"CAST(MAX(CASE WHEN {m} THEN a + c END) AS BIGINT) AS ct1{i}"
        )
        seg_cols.append(
            f"CAST(MAX(CASE WHEN {m} THEN c + dd END) AS BIGINT) AS cm0{i}"
        )
    cols = ",\n         ".join(seg_cols)
    return f"""
WITH cells AS (
  SELECT c_mktsegment,
         CAST(SUM(CASE WHEN c_acctbal > {MH_BAL_THRESHOLD!r} AND o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END) AS BIGINT) AS a,
         CAST(SUM(CASE WHEN c_acctbal > {MH_BAL_THRESHOLD!r} AND o_orderpriority <> '1-URGENT' THEN 1 ELSE 0 END) AS BIGINT) AS b,
         CAST(SUM(CASE WHEN c_acctbal <= {MH_BAL_THRESHOLD!r} AND o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END) AS BIGINT) AS c,
         CAST(SUM(CASE WHEN c_acctbal <= {MH_BAL_THRESHOLD!r} AND o_orderpriority <> '1-URGENT' THEN 1 ELSE 0 END) AS BIGINT) AS dd
  FROM orders JOIN customer ON o_custkey = c_custkey
  GROUP BY 1
), red AS (
  SELECT CAST(SUM(a + b + c + dd) AS BIGINT) AS n_rows,
         {cols}
  FROM cells
), staged0 AS (
  SELECT *, {t['psi']} AS psi FROM red
), staged AS (
  SELECT *, {", ".join(f"{e_sql} AS e{i}" for i, e_sql in enumerate(t['e']))}
  FROM staged0
)
SELECT n_rows,
       psi AS mh_or,
       CASE WHEN {t['ok']} THEN {t['bd']} END AS bd_stat,
       CASE WHEN {t['ok']}
            THEN CAST({t['bd']} > {_BD_CHI2_CRIT_4DF} AS INT) END AS heterogeneous_5pct
FROM staged
"""


# ---------------------------------------------------------------------------
# Weighted kappa on ordinal raters (round 13 late)
# ---------------------------------------------------------------------------

# 3-level ordinal raters: document-length bands (chars) vs token bands,
# literal cuts — level 0 short / 1 medium / 2 long
WK_CHAR_CUTS = (150, 300)
WK_TOKEN_CUTS = (25, 55)


def q_kappa_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohen's WEIGHTED kappa (Cohen 1968) between two 3-level ORDINAL
    document raters (character-band vs token-band length classifiers):
    the agreement coefficient for ordered labels, where confusing
    'short' with 'long' must cost more than 'short' with 'medium' —
    the case the unweighted ``cohens_kappa`` (and ``gwet_ac1`` /
    ``krippendorff_alpha``'s nominal metric) can't express. Both the
    QUADRATIC-weight form (v_ij = (i−j)² — the ICC-equivalent, the
    standard for ordinal QA rubrics) and the LINEAR form (v_ij =
    |i−j|) ship from the same table.

    Exactness: the 3×3 cells are ONE conditional hash agg of exact
    integer counts on the literal level domain; with disagreement
    weights, κ_w = 1 − n·Σv_ij·O_ij / Σv_ij·r_i·c_j where O is the
    cell count and r/c the integer margins — both numerator and
    denominator are exact DECIMAL(38,0) integer cross-products
    (weights are small integer literals), and each κ is ONE final
    IEEE division. Degenerate contract: a zero expected-disagreement
    denominator (a constant rater) → κ NULL under an explicit guard.

    Scale shape: one scan with per-row band arithmetic, one 9-cell
    map-side-combinable agg, 1-row literal-domain arithmetic.

    Reference analog: none (engine addition, SURVEY.md §2.7)."""
    docs = load_table(spark, sf_dir, "documents")
    tok_n = F.size(
        F.filter(F.split(F.col("text"), " "), lambda t: t != "")
    )
    a = (
        F.when(F.col("n_chars") < WK_CHAR_CUTS[0], 0)
        .when(F.col("n_chars") < WK_CHAR_CUTS[1], 1)
        .otherwise(2)
    )
    b = (
        F.when(tok_n < WK_TOKEN_CUTS[0], 0)
        .when(tok_n < WK_TOKEN_CUTS[1], 1)
        .otherwise(2)
    )
    based = docs.select(a.alias("ra"), b.alias("rb"))
    aggs = [F.count(F.lit(1)).cast("long").alias("n")]
    for i in range(3):
        for j in range(3):
            aggs.append(
                F.sum(((F.col("ra") == i) & (F.col("rb") == j)).cast("long"))
                .cast("long")
                .alias(f"o{i}{j}")
            )
    red = based.agg(*aggs)

    def dec(c):
        return c.cast("decimal(38,0)")

    r = {i: sum(F.col(f"o{i}{j}") for j in range(3)) for i in range(3)}
    c = {j: sum(F.col(f"o{i}{j}") for i in range(3)) for j in range(3)}

    def kappa(weight):
        num = None
        den = None
        for i in range(3):
            for j in range(3):
                w = weight(i, j)
                if w == 0:
                    continue
                t_o = dec(F.col(f"o{i}{j}")) * F.lit(w)
                t_e = dec(r[i]) * dec(c[j]) * F.lit(w)
                num = t_o if num is None else num + t_o
                den = t_e if den is None else den + t_e
        num_d = (dec(F.col("n")) * num).cast("decimal(38,0)")
        den_d = den.cast("decimal(38,0)")
        k = F.lit(1.0) - dec_to_double(num_d) / dec_to_double(den_d)
        return F.when(den_d > 0, k)

    return red.select(
        "n",
        kappa(lambda i, j: (i - j) * (i - j)).alias("kappa_quadratic"),
        kappa(lambda i, j: abs(i - j)).alias("kappa_linear"),
    )


def _sql_kappa_weighted() -> str:
    cells = [f"CAST(COUNT(*) AS BIGINT) AS n"]
    for i in range(3):
        for j in range(3):
            cells.append(
                f"CAST(SUM(CASE WHEN ra = {i} AND rb = {j} THEN 1 ELSE 0 END) AS BIGINT) AS o{i}{j}"
            )
    cols = ",\n         ".join(cells)
    r = {i: " + ".join(f"o{i}{j}" for j in range(3)) for i in range(3)}
    c = {j: " + ".join(f"o{i}{j}" for i in range(3)) for j in range(3)}

    def kappa(weight):
        nums, dens = [], []
        for i in range(3):
            for j in range(3):
                w = weight(i, j)
                if w == 0:
                    continue
                nums.append(f"CAST(o{i}{j} AS DECIMAL(38,0)) * {w}")
                dens.append(
                    f"CAST({r[i]} AS DECIMAL(38,0)) * CAST({c[j]} AS DECIMAL(38,0)) * {w}"
                )
        num = f"CAST(CAST(n AS DECIMAL(38,0)) * ({' + '.join(nums)}) AS DECIMAL(38,0))"
        den = f"CAST({' + '.join(dens)} AS DECIMAL(38,0))"
        k = f"(1.0 - {sql_dec_to_double(num)} / {sql_dec_to_double(den)})"
        return f"CASE WHEN {den} > 0 THEN {k} END"

    kq = kappa(lambda i, j: (i - j) * (i - j))
    kl = kappa(lambda i, j: abs(i - j))
    return f"""
WITH based AS (
  SELECT CASE WHEN n_chars < {WK_CHAR_CUTS[0]} THEN 0
              WHEN n_chars < {WK_CHAR_CUTS[1]} THEN 1 ELSE 2 END AS ra,
         CASE WHEN len(list_filter(string_split(text, ' '), x -> x <> '')) < {WK_TOKEN_CUTS[0]} THEN 0
              WHEN len(list_filter(string_split(text, ' '), x -> x <> '')) < {WK_TOKEN_CUTS[1]} THEN 1 ELSE 2 END AS rb
  FROM documents
), red AS (
  SELECT {cols}
  FROM based
)
SELECT n,
       {kq} AS kappa_quadratic,
       {kl} AS kappa_linear
FROM red
"""


# ---------------------------------------------------------------------------
# Dunn post-hoc pairwise test (round 13 late)
# ---------------------------------------------------------------------------

# Bonferroni z cut for 10 pairwise comparisons at family alpha 0.05:
# Phi^-1(1 - 0.025/10), Python-folded
_DUNN_Z_CRIT_BONF10 = 2.807033768343811


def q_dunn_posthoc_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dunn's (1964) post-hoc pairwise comparisons after
    ``kruskal_wallis`` — the question KW's single H cannot answer:
    WHICH priority classes differ in order-value location? For each of
    the C(5,2) = 10 pairs, z_ij = (R̄_i − R̄_j)/√(V·(1/nᵢ + 1/nⱼ)) with
    the tie-corrected pooled rank variance V = N(N+1)/12 −
    Σ(t³−t)/(12(N−1)), judged at the Bonferroni-corrected literal cut
    (family α = 0.05 over 10 comparisons). The standard multiple-
    comparison companion every KW rejection is followed by.

    Exactness: doubled midranks per (value, group) cell keep every
    rank sum integral (R2_g = Σc_g(2t+c+1), the house identity); mean-
    rank differences are R2_i·nⱼ − R2_j·nᵢ over 2nᵢnⱼ — exact DECIMAL
    numerators, one IEEE division; the tie term Σ(t³−t) is an exact
    DECIMAL hash sum; each z is one fixed IEEE sequence and the
    10-pair frame is a tiny self-join of the ≤5-row group summary
    (g1 < g2 ordering deterministic). Degenerate contract: V ≤ 0 (all
    values tied) → z/significance NULL.

    Scale shape: one (value, group) hash agg + the ``_cum_prev`` bucketed
    window (the kruskal_wallis frame), one ≤5-row reduce, one ≤10-row
    self-join.

    Reference analog: none (engine addition, SURVEY.md §2.7)."""
    orders = load_table(spark, sf_dir, "orders")
    per_vz = (
        orders.select(
            F.col("o_totalprice").alias("v"),
            F.col("o_orderpriority").alias("g"),
        )
        .groupBy("v", "g")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    per_v = per_vz.groupBy("v").agg(F.sum("c").cast("long").alias("cv"))
    ranked_v = _cum_prev(per_v, ["v"], {"_t": F.col("cv")}, materialize=True).select(
        "v",
        "cv",
        (F.lit(2) * F.col("_t") + F.col("cv") + F.lit(1)).alias("m"),
    )

    def dec(c):
        return c.cast("decimal(38,0)")

    groups = (
        per_vz.join(ranked_v, "v")
        .groupBy("g")
        .agg(
            F.sum("c").cast("long").alias("n"),
            F.sum(dec(F.col("c")) * dec(F.col("m")))
            .cast("decimal(38,0)")
            .alias("r2"),
        )
    )
    tot = ranked_v.agg(
        F.sum("cv").cast("long").alias("nn"),
        F.sum(
            dec(F.col("cv")) * dec(F.col("cv")) * dec(F.col("cv"))
            - dec(F.col("cv"))
        )
        .cast("decimal(38,0)")
        .alias("tie3"),
    )
    a = groups.select(
        F.col("g").alias("g1"),
        F.col("n").alias("n1"),
        F.col("r2").alias("r2_1"),
    )
    b = groups.select(
        F.col("g").alias("g2"),
        F.col("n").alias("n2"),
        F.col("r2").alias("r2_2"),
    )
    # broadcast the right side of the tiny pair join so the plan is a
    # BroadcastNestedLoopJoin, not a CartesianProduct (plan-audit rule;
    # both frames are ≤5 rows so either executes instantly — the broadcast
    # keeps the 1000-executor plan shuffle-free too)
    pairs = (
        a.crossJoin(F.broadcast(b))
        .filter(F.col("g1") < F.col("g2"))
        .crossJoin(F.broadcast(tot))
    )
    nd = F.col("nn").cast("double")
    vpool = nd * (nd + F.lit(1.0)) / F.lit(12.0) - dec_to_double(
        F.col("tie3")
    ) / (F.lit(12.0) * (nd - F.lit(1.0)))
    n1d = F.col("n1").cast("double")
    n2d = F.col("n2").cast("double")
    # mean-rank difference: (R2_1/n1 - R2_2/n2)/2 with exact decimal
    # numerator R2_1·n2 − R2_2·n1 over 2·n1·n2
    diff = dec_to_double(
        (F.col("r2_1") * dec(F.col("n2")) - F.col("r2_2") * dec(F.col("n1")))
        .cast("decimal(38,0)")
    ) / (F.lit(2.0) * n1d * n2d)
    z = diff / F.sqrt(vpool * (F.lit(1.0) / n1d + F.lit(1.0) / n2d))
    ok = vpool > 0
    return pairs.select(
        "g1",
        "g2",
        "n1",
        "n2",
        diff.alias("mean_rank_diff"),
        F.when(ok, z).alias("z_dunn"),
        F.when(ok, (F.abs(z) > F.lit(_DUNN_Z_CRIT_BONF10)).cast("int")).alias(
            "significant_bonf"
        ),
    ).orderBy("g1", "g2")


def _sql_dunn() -> str:
    vpool = (
        "(CAST(nn AS DOUBLE) * (CAST(nn AS DOUBLE) + 1.0) / 12.0"
        f" - {sql_dec_to_double('tie3')} / (12.0 * (CAST(nn AS DOUBLE) - 1.0)))"
    )
    diff = (
        f"({sql_dec_to_double('CAST(r2_1 * CAST(n2 AS DECIMAL(38,0)) - r2_2 * CAST(n1 AS DECIMAL(38,0)) AS DECIMAL(38,0))')}"
        " / (2.0 * CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)))"
    )
    z = (
        f"({diff} / sqrt({vpool} * (1.0 / CAST(n1 AS DOUBLE)"
        " + 1.0 / CAST(n2 AS DOUBLE))))"
    )
    return f"""
WITH per_vz AS (
  SELECT o_totalprice AS v, o_orderpriority AS g,
         CAST(COUNT(*) AS BIGINT) AS c
  FROM orders GROUP BY 1, 2
), per_v AS (
  SELECT v, CAST(SUM(c) AS BIGINT) AS cv FROM per_vz GROUP BY 1
), ranked_v AS (
  SELECT v, cv,
         2 * COALESCE(SUM(cv) OVER (ORDER BY v
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) + cv + 1 AS m
  FROM per_v
), groups AS (
  SELECT g, CAST(SUM(c) AS BIGINT) AS n,
         CAST(SUM(CAST(c AS DECIMAL(38,0)) * CAST(m AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS r2
  FROM per_vz JOIN ranked_v USING (v)
  GROUP BY 1
), tot AS (
  SELECT CAST(SUM(cv) AS BIGINT) AS nn,
         CAST(SUM(CAST(cv AS DECIMAL(38,0)) * CAST(cv AS DECIMAL(38,0)) * CAST(cv AS DECIMAL(38,0)) - CAST(cv AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS tie3
  FROM ranked_v
), pairs AS (
  SELECT a.g AS g1, b.g AS g2, a.n AS n1, b.n AS n2,
         a.r2 AS r2_1, b.r2 AS r2_2, nn, tie3
  FROM groups a CROSS JOIN groups b CROSS JOIN tot
  WHERE a.g < b.g
)
SELECT g1, g2, n1, n2,
       {diff} AS mean_rank_diff,
       CASE WHEN {vpool} > 0 THEN {z} END AS z_dunn,
       CASE WHEN {vpool} > 0
            THEN CAST(abs({z}) > {_DUNN_Z_CRIT_BONF10} AS INT) END AS significant_bonf
FROM pairs
ORDER BY g1, g2
"""


# ---------------------------------------------------------------------------
# Cochran-Mantel-Haenszel chi-square test (round 13)
# ---------------------------------------------------------------------------

_CMH_CHI2_CRIT_1DF = 3.841458820694124


def q_cmh_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cochran-Mantel-Haenszel χ² TEST on the same stratified 2×2
    tables as ``mantel_haenszel_or`` / ``breslow_day_test`` (high-
    balance exposure × urgent outcome across the five market
    segments): CMH = (Σ_s(a_s − E_s))² / Σ_s V_s ~ χ²(1), with
    E_s = m1·t1/n and the exact hypergeometric
    V_s = m1·m0·t1·t0/(n²(n−1)) — the significance half of the MH
    triad (MH_OR estimates the common effect, Breslow-Day checks
    pooling is legitimate, CMH tests whether the pooled effect is
    REAL). Uses the Cochran form (no continuity correction),
    documented.

    Exactness: cells/margins are exact integer counts on the LITERAL
    five-segment domain; each stratum's deviation a − E and variance
    are ONE fixed IEEE expression on exact integers (E and V are
    rational — no transcendental anywhere), summed in fixed
    left-to-right literal order (the module discipline, ≤5 terms); the
    statistic is one final division, compared against the literal
    χ²(1) cut. Degenerate contract: ΣV = 0 (a margin empty in every
    stratum) → statistic NULL under an explicit guard.

    Scale shape: identical to mantel_haenszel_or — one fact⋈dim join,
    one conditional-count hash agg to ≤5 rows, 1-row literal-domain
    arithmetic.

    Reference analog: none (engine addition, SURVEY.md §2.7)."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderpriority"
    )
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment", "c_acctbal"
    )
    j = orders.join(cust, orders["o_custkey"] == cust["c_custkey"])
    e = (F.col("c_acctbal") > F.lit(MH_BAL_THRESHOLD)).cast("int")
    d = (F.col("o_orderpriority") == "1-URGENT").cast("int")
    cells = j.groupBy("c_mktsegment").agg(
        F.sum(e * d).cast("long").alias("a"),
        F.sum(e * (1 - d)).cast("long").alias("b"),
        F.sum((1 - e) * d).cast("long").alias("c"),
        F.sum((1 - e) * (1 - d)).cast("long").alias("dd"),
    )
    nd = (F.col("a") + F.col("b") + F.col("c") + F.col("dd")).cast("double")
    m1 = (F.col("a") + F.col("b")).cast("double")
    m0 = (F.col("c") + F.col("dd")).cast("double")
    t1 = (F.col("a") + F.col("c")).cast("double")
    t0 = (F.col("b") + F.col("dd")).cast("double")
    dev_t = F.col("a").cast("double") - m1 * t1 / nd
    var_t = m1 * m0 * t1 * t0 / (nd * nd * (nd - F.lit(1.0)))
    aggs = [
        F.sum(F.col("a") + F.col("b") + F.col("c") + F.col("dd"))
        .cast("long")
        .alias("n_rows"),
    ]
    for i, seg in enumerate(_SEGMENTS):
        m = F.col("c_mktsegment") == seg
        aggs.append(F.max(F.when(m, dev_t)).alias(f"dv{i}"))
        aggs.append(F.max(F.when(m, var_t)).alias(f"vr{i}"))
    red = cells.agg(*aggs)
    dev = sum((F.col(f"dv{i}") for i in range(1, len(_SEGMENTS))), F.col("dv0"))
    var = sum((F.col(f"vr{i}") for i in range(1, len(_SEGMENTS))), F.col("vr0"))
    stat = dev * dev / var
    ok = var > 0
    return red.select(
        "n_rows",
        F.when(ok, stat).alias("cmh_chi2"),
        F.when(ok, (stat > F.lit(_CMH_CHI2_CRIT_1DF)).cast("int")).alias(
            "significant_5pct"
        ),
    )


def _sql_cmh() -> str:
    seg_cols = []
    for i, seg in enumerate(_SEGMENTS):
        m = f"c_mktsegment = '{seg}'"
        nd = "CAST(a + b + c + dd AS DOUBLE)"
        m1 = "CAST(a + b AS DOUBLE)"
        m0 = "CAST(c + dd AS DOUBLE)"
        t1 = "CAST(a + c AS DOUBLE)"
        t0 = "CAST(b + dd AS DOUBLE)"
        seg_cols.append(
            f"MAX(CASE WHEN {m} THEN CAST(a AS DOUBLE) - {m1} * {t1} / {nd} END) AS dv{i}"
        )
        seg_cols.append(
            f"MAX(CASE WHEN {m} THEN {m1} * {m0} * {t1} * {t0}"
            f" / ({nd} * {nd} * ({nd} - 1.0)) END) AS vr{i}"
        )
    cols = ",\n         ".join(seg_cols)
    dev = "(" + " + ".join(f"dv{i}" for i in range(len(_SEGMENTS))) + ")"
    var = "(" + " + ".join(f"vr{i}" for i in range(len(_SEGMENTS))) + ")"
    stat = f"({dev} * {dev} / {var})"
    return f"""
WITH cells AS (
  SELECT c_mktsegment,
         CAST(SUM(CASE WHEN c_acctbal > {MH_BAL_THRESHOLD!r} AND o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END) AS BIGINT) AS a,
         CAST(SUM(CASE WHEN c_acctbal > {MH_BAL_THRESHOLD!r} AND o_orderpriority <> '1-URGENT' THEN 1 ELSE 0 END) AS BIGINT) AS b,
         CAST(SUM(CASE WHEN c_acctbal <= {MH_BAL_THRESHOLD!r} AND o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END) AS BIGINT) AS c,
         CAST(SUM(CASE WHEN c_acctbal <= {MH_BAL_THRESHOLD!r} AND o_orderpriority <> '1-URGENT' THEN 1 ELSE 0 END) AS BIGINT) AS dd
  FROM orders JOIN customer ON o_custkey = c_custkey
  GROUP BY 1
), red AS (
  SELECT CAST(SUM(a + b + c + dd) AS BIGINT) AS n_rows,
         {cols}
  FROM cells
)
SELECT n_rows,
       CASE WHEN {var} > 0 THEN {stat} END AS cmh_chi2,
       CASE WHEN {var} > 0
            THEN CAST({stat} > {_CMH_CHI2_CRIT_1DF} AS INT) END AS significant_5pct
FROM red
"""


# ---------------------------------------------------------------------------
# Cuzick trend test (round 13)
# ---------------------------------------------------------------------------

_CUZICK_Z_CRIT = 1.959963984540054


def q_cuzick_trend_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cuzick's Wilcoxon-type test for TREND across ordered groups
    (Cuzick 1985): does order value trend monotonically with the
    priority LADDER 1-URGENT..5-LOW (scores z = 1..5 from the priority
    prefix digit)? T = Σ zᵢ·rᵢ over global midranks — the k-group
    ordered-alternative test in the LINEAR-rank family, complementing
    ``jonckheere_terpstra`` (pairwise-U family) and ``cochran_armitage``
    (binary outcome): same question, the rank-statistic formulation
    clinicians cite.

    Exact permutation moments (exact under ties): for a linear rank
    statistic, E[T] = Σz·Σr/N and Var[T] = Σ(z−z̄)²·Σ(r−r̄)²/(N−1).
    With doubled midranks m = 2t+c+1 per (value, score) cell,
    2T = Σ c·z·m, Σ(z−z̄)²·N = N·Σc·z² − (Σc·z)² and
    Σ(r−r̄)²·4N = N·Σc·m² − (Σc·m)² are exact DECIMAL(38,0); the
    standardized z = (N·2T − Σz·2Σr... assembled as
    (N·T₂ − Σz·Σm)/√(A·B₄/(N−1)) with T₂ = 2T, Σm = doubled rank sum,
    A = N·Σz²−(Σz)², B₄ = N·Σm²−(Σm)² — every numerator exact decimal,
    conversions through the portable limb-split (B₄ ≤ 4N⁴ and A·B₄ ≤
    100·N⁶ stays in DECIMAL(38,0) to N ≈ 10⁶; past that, convert A and
    B₄ separately and multiply in IEEE — one documented rounding step).
    Degenerate contract: zero rank variance (all values tied) or zero
    score variance (one group) → z/significance NULL.

    Scale shape: one (value, score) hash agg, the ``_cum_prev``
    bucketed cumulative, one 1-row reduce.

    Reference analog: none (engine addition, SURVEY.md §2.7)."""
    orders = load_table(spark, sf_dir, "orders").select(
        F.col("o_totalprice").alias("v"),
        F.substring("o_orderpriority", 1, 1).cast("int").alias("z"),
    )
    per_vz = orders.groupBy("v", "z").agg(F.count(F.lit(1)).cast("long").alias("c"))
    per_v = per_vz.groupBy("v").agg(F.sum("c").cast("long").alias("cv"))
    ranked_v = _cum_prev(per_v, ["v"], {"_t": F.col("cv")}, materialize=True).select(
        "v",
        "cv",
        (F.lit(2) * F.col("_t") + F.col("cv") + F.lit(1)).alias("m"),
    )
    cells = per_vz.join(ranked_v, "v")

    def dec(c):
        return c.cast("decimal(38,0)")

    red = cells.agg(
        F.sum("c").cast("long").alias("n"),
        F.sum(dec(F.col("c")) * dec(F.col("z"))).cast("decimal(38,0)").alias("sz"),
        F.sum(dec(F.col("c")) * dec(F.col("z")) * dec(F.col("z")))
        .cast("decimal(38,0)")
        .alias("sz2"),
        F.sum(dec(F.col("c")) * dec(F.col("z")) * dec(F.col("m")))
        .cast("decimal(38,0)")
        .alias("t2"),
    )
    red_v = ranked_v.agg(
        F.sum(dec(F.col("cv")) * dec(F.col("m"))).cast("decimal(38,0)").alias("sm"),
        F.sum(dec(F.col("cv")) * dec(F.col("m")) * dec(F.col("m")))
        .cast("decimal(38,0)")
        .alias("sm2"),
    )
    mid = red.crossJoin(red_v).select(
        "n",
        "t2",
        (dec(F.col("n")) * F.col("t2") - F.col("sz") * F.col("sm"))
        .cast("decimal(38,0)")
        .alias("num"),
        (dec(F.col("n")) * F.col("sz2") - F.col("sz") * F.col("sz"))
        .cast("decimal(38,0)")
        .alias("a_var"),
        (dec(F.col("n")) * F.col("sm2") - F.col("sm") * F.col("sm"))
        .cast("decimal(38,0)")
        .alias("b4_var"),
    )
    nd = F.col("n").cast("double")
    z = dec_to_double(F.col("num")) / F.sqrt(
        dec_to_double(F.col("a_var"))
        * dec_to_double(F.col("b4_var"))
        / (nd - F.lit(1.0))
    )
    ok = (F.col("a_var") > 0) & (F.col("b4_var") > 0)
    return mid.select(
        "n",
        (dec_to_double(F.col("t2")) / F.lit(2.0)).alias("t_stat"),
        F.when(ok, z).alias("z_cuzick"),
        F.when(ok, (F.abs(z) > F.lit(_CUZICK_Z_CRIT)).cast("int")).alias(
            "significant_5pct"
        ),
    )


def _sql_cuzick() -> str:
    z = (
        f"({sql_dec_to_double('num')} / sqrt({sql_dec_to_double('a_var')}"
        f" * {sql_dec_to_double('b4_var')} / (CAST(n AS DOUBLE) - 1.0)))"
    )
    return f"""
WITH per_vz AS (
  SELECT o_totalprice AS v,
         CAST(substring(o_orderpriority, 1, 1) AS INT) AS z,
         CAST(COUNT(*) AS BIGINT) AS c
  FROM orders GROUP BY 1, 2
), per_v AS (
  SELECT v, CAST(SUM(c) AS BIGINT) AS cv FROM per_vz GROUP BY 1
), ranked_v AS (
  SELECT v, cv,
         2 * COALESCE(SUM(cv) OVER (ORDER BY v
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) + cv + 1 AS m
  FROM per_v
), red AS (
  SELECT CAST(SUM(c) AS BIGINT) AS n,
         CAST(SUM(CAST(c AS DECIMAL(38,0)) * CAST(z AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS sz,
         CAST(SUM(CAST(c AS DECIMAL(38,0)) * CAST(z AS DECIMAL(38,0)) * CAST(z AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS sz2,
         CAST(SUM(CAST(c AS DECIMAL(38,0)) * CAST(z AS DECIMAL(38,0)) * CAST(m AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS t2
  FROM per_vz JOIN ranked_v USING (v)
), red_v AS (
  SELECT CAST(SUM(CAST(cv AS DECIMAL(38,0)) * CAST(m AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS sm,
         CAST(SUM(CAST(cv AS DECIMAL(38,0)) * CAST(m AS DECIMAL(38,0)) * CAST(m AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS sm2
  FROM ranked_v
), mid AS (
  SELECT n, t2,
         CAST(CAST(n AS DECIMAL(38,0)) * t2 - sz * sm AS DECIMAL(38,0)) AS num,
         CAST(CAST(n AS DECIMAL(38,0)) * sz2 - sz * sz AS DECIMAL(38,0)) AS a_var,
         CAST(CAST(n AS DECIMAL(38,0)) * sm2 - sm * sm AS DECIMAL(38,0)) AS b4_var
  FROM red CROSS JOIN red_v
)
SELECT n,
       {sql_dec_to_double('t2')} / 2.0 AS t_stat,
       CASE WHEN a_var > 0 AND b4_var > 0 THEN {z} END AS z_cuzick,
       CASE WHEN a_var > 0 AND b4_var > 0
            THEN CAST(abs({z}) > {_CUZICK_Z_CRIT} AS INT) END AS significant_5pct
FROM mid
"""


# ---------------------------------------------------------------------------
# Friedman rank test (round 14)
# ---------------------------------------------------------------------------

FRIED_YM_LO = 1995 * 12 + 1  # 24 monthly blocks: 1995-01 .. 1996-12
FRIED_YM_HI = 1996 * 12 + 12
FRIED_B = FRIED_YM_HI - FRIED_YM_LO + 1
FRIED_K = 5  # treatments = order priorities
FRIED_CHI2_CRIT_DF4 = 9.487729036781154  # chi2(4) 95% — literal, no CDFs


def q_friedman_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Friedman rank test: do the five order priorities differ in monthly
    revenue, blocking by month? Each of the 24 months of 1995-1996 ranks
    the priorities by revenue (MIDRANKS on ties over the zero-filled
    month x priority grid); chi2_F is the tie-corrected Friedman statistic
    and F_ID the Iman-Davenport transform (1980) that fixes Friedman's
    conservatism at small k. The unweighted sibling of ``quade_test``
    (which range-weights blocks) and the midrank complement of
    ``kendalls_w`` (competition ranks, m(n-1)W algebra): the three make
    the standard within-block concordance ladder.

    Exactness: DOUBLED within-block midranks dr = 2*rank + ties - 1 keep
    every rank integral; with DR_j = sum_i dr_ij the tie-corrected
    statistic collapses to exact INTEGER sums —
    chi2_F = (k-1) * sum_j (DR_j - b(k+1))^2 / (sum_ij dr_ij^2 - b*k*(k+1)^2)
    (both sides are 4x the textbook quantities, so the ratio is exact),
    and F_ID = (b-1)*chi2 / (b(k-1) - chi2) is one more IEEE step.
    Degenerate contract: a zero denominator (every block fully tied) or
    F_ID's own zero denominator (chi2 at its maximum b(k-1) — perfect
    concordance) -> the affected statistic NULL under explicit guards;
    significance is guarded on the measured b = FRIED_B block count (the
    ``quade_test`` drift rule).

    Scale shape: one data-sized hash agg to the b x k grid; ranks and
    both reductions run on <= 120 rows.

    Reference analog: none (engine addition, SURVEY.md §2.7)."""
    orders = load_table(spark, sf_dir, "orders")
    ym = F.year("o_orderdate") * 12 + F.month("o_orderdate")
    rev = (
        orders.filter((ym >= FRIED_YM_LO) & (ym <= FRIED_YM_HI))
        .groupBy(ym.alias("ym"), F.col("o_orderpriority").alias("trt"))
        .agg(
            F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("bigint"))
            .cast("long")
            .alias("cents")
        )
    )
    months = spark.range(FRIED_YM_LO, FRIED_YM_HI + 1).select(
        F.col("id").cast("int").alias("ym")
    )
    prios = rev.select("trt").distinct()
    spine = prios.crossJoin(F.broadcast(months))
    grid = spine.join(rev, ["ym", "trt"], "left").select(
        "ym", "trt", F.coalesce("cents", F.lit(0)).cast("long").alias("cents")
    )
    w_rank = Window.partitionBy("ym").orderBy("cents")
    w_ties = Window.partitionBy("ym", "cents")
    ranked = grid.select(
        "ym",
        "trt",
        (F.lit(2) * F.rank().over(w_rank) + F.count(F.lit(1)).over(w_ties) - F.lit(1))
        .cast("long")
        .alias("dr"),
    )
    per_trt = ranked.groupBy("trt").agg(
        F.sum("dr").cast("long").alias("drj"),
        F.count(F.lit(1)).cast("long").alias("b_t"),
        F.sum(F.col("dr") * F.col("dr")).cast("long").alias("dr2"),
    )
    red = per_trt.agg(
        F.count(F.lit(1)).cast("long").alias("k_t"),
        F.max("b_t").cast("long").alias("b"),
        F.sum("dr2").cast("long").alias("sum_dr2"),
        F.sum(
            (
                F.col("drj") - F.col("b_t") * F.lit(FRIED_K + 1)
            ).cast("decimal(38,0)")
            * (F.col("drj") - F.col("b_t") * F.lit(FRIED_K + 1)).cast(
                "decimal(38,0)"
            )
        )
        .cast("decimal(38,0)")
        .alias("sum_dev2"),
    )
    den = (
        F.col("sum_dr2")
        - F.col("b") * F.lit(FRIED_K) * F.lit((FRIED_K + 1) * (FRIED_K + 1))
    ).cast("long")
    chi2 = (
        (F.col("k_t").cast("double") - F.lit(1.0))
        * dec_to_double(F.col("sum_dev2"))
        / den.cast("double")
    )
    bd = F.col("b").cast("double")
    id_den = bd * (F.col("k_t").cast("double") - F.lit(1.0)) - chi2
    f_id = (bd - F.lit(1.0)) * chi2 / id_den
    ok = den > 0
    chi2_c = F.when(ok, chi2)
    return red.select(
        F.col("b").alias("n_blocks"),
        F.col("k_t").alias("k_treatments"),
        chi2_c.alias("chi2_friedman"),
        F.when(ok & (id_den > 0), f_id).alias("f_imandav"),
        F.when(
            ok & (F.col("b") == FRIED_B) & (F.col("k_t") == FRIED_K),
            (chi2_c > F.lit(FRIED_CHI2_CRIT_DF4)).cast("int"),
        ).alias("significant_5pct"),
    )


def _sql_friedman() -> str:
    kp1 = FRIED_K + 1
    kp1sq = kp1 * kp1
    dev = f"CAST(drj - b_t * {kp1} AS DECIMAL(38,0))"
    return f"""
WITH rev AS (
  SELECT YEAR(o_orderdate) * 12 + MONTH(o_orderdate) AS ym,
         o_orderpriority AS trt,
         CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents
  FROM orders
  WHERE YEAR(o_orderdate) * 12 + MONTH(o_orderdate) BETWEEN {FRIED_YM_LO} AND {FRIED_YM_HI}
  GROUP BY 1, 2
), months AS (
  SELECT {FRIED_YM_LO} + UNNEST(RANGE({FRIED_B})) AS ym
), prios AS (
  SELECT DISTINCT trt FROM rev
), grid AS (
  SELECT m.ym, p.trt, CAST(COALESCE(r.cents, 0) AS BIGINT) AS cents
  FROM months m CROSS JOIN prios p
  LEFT JOIN rev r ON r.ym = m.ym AND r.trt = p.trt
), ranked AS (
  SELECT ym, trt,
         CAST(2 * RANK() OVER (PARTITION BY ym ORDER BY cents)
              + COUNT(*) OVER (PARTITION BY ym, cents) - 1 AS BIGINT) AS dr
  FROM grid
), per_trt AS (
  SELECT trt,
         CAST(SUM(dr) AS BIGINT) AS drj,
         CAST(COUNT(*) AS BIGINT) AS b_t,
         CAST(SUM(dr * dr) AS BIGINT) AS dr2
  FROM ranked GROUP BY 1
), red AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS k_t,
         CAST(MAX(b_t) AS BIGINT) AS b,
         CAST(SUM(dr2) AS BIGINT) AS sum_dr2,
         CAST(SUM({dev} * {dev}) AS DECIMAL(38,0)) AS sum_dev2
  FROM per_trt
), fin AS (
  SELECT b, k_t,
         CAST(sum_dr2 - b * {FRIED_K} * {kp1sq} AS BIGINT) AS den,
         (CAST(k_t AS DOUBLE) - 1.0) * {sql_dec_to_double("sum_dev2")}
           / CAST(sum_dr2 - b * {FRIED_K} * {kp1sq} AS DOUBLE) AS chi2
  FROM red
)
SELECT b AS n_blocks, k_t AS k_treatments,
       CASE WHEN den > 0 THEN chi2 END AS chi2_friedman,
       CASE WHEN den > 0
             AND CAST(b AS DOUBLE) * (CAST(k_t AS DOUBLE) - 1.0) - chi2 > 0
            THEN (CAST(b AS DOUBLE) - 1.0) * chi2
                 / (CAST(b AS DOUBLE) * (CAST(k_t AS DOUBLE) - 1.0) - chi2)
            END AS f_imandav,
       CASE WHEN den > 0 AND b = {FRIED_B} AND k_t = {FRIED_K}
            THEN CAST(chi2 > {FRIED_CHI2_CRIT_DF4!r} AS INT) END AS significant_5pct
FROM fin
"""


# ---------------------------------------------------------------------------
# Welch's heteroskedastic one-way ANOVA (round 14)
# ---------------------------------------------------------------------------

_WELCH_PRIOS = [
    "1-URGENT",
    "2-HIGH",
    "3-MEDIUM",
    "4-NOT SPECIFIED",
    "5-LOW",
]


def q_welch_anova(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Welch's heteroskedastic one-way ANOVA (Welch 1951) of order value
    across the five priorities: the k-group generalization of
    ``welch_ttest`` that ``anova_oneway`` users reach for the moment
    ``hartley_fmax`` or ``levene_brown_forsythe`` rejects equal
    variances — groups are weighted w_j = n_j/s²_j so no pooled variance
    is ever formed. F* = [Σw_j(x̄_j−x̄_w)²/(k−1)] / [1 + 2(k−2)/(k²−1)·H]
    with H = Σ(1−w_j/W)²/(n_j−1), and the Welch-Satterthwaite
    denominator df2 = (k²−1)/(3H) reported alongside (non-integer by
    construction — which is WHY no literal critical value is emitted:
    the 5% cut moves with df2; the module rule keeps CDFs out).

    Exactness: per-group (n, Σc, Σc²) are ONE exact-moment hash agg (the
    ``anova_oneway`` base); every per-group mean/variance is IEEE on
    exact inputs, and ALL cross-group reductions extract the five
    LITERAL priority terms as named conditional aggregates summed in a
    fixed left-to-right sequence (the ``_FLAGS`` note — these magnitudes
    outgrow the floor-quantization trick). Degenerate contract: a
    missing literal group, any n_j < 2, or a zero group variance → every
    statistic NULL (the guard also covers the k≠5 drift case since the
    literal extraction then yields NULL).

    Scale shape: one map-side-combinable hash agg; everything after runs
    on one row.

    Reference analog: none (engine addition, SURVEY.md §2.7)."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderpriority",
        F.round(F.col("o_totalprice") * 100, 0).cast("bigint").alias("c"),
    )
    m = orders.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("c").cast("decimal(38,0)").cast("double").alias("s"),
        F.sum((F.col("c") * F.col("c")).cast("decimal(38,0)"))
        .cast("decimal(38,0)")
        .alias("ss_dec"),
    )
    nd = F.col("n").cast("double")
    mean_j = F.col("s") / nd
    var_j = (nd * dec_to_double(F.col("ss_dec")) - F.col("s") * F.col("s")) / (
        nd * (nd - F.lit(1.0))
    )
    g = F.col("o_orderpriority")
    aggs = [F.sum("n").cast("long").alias("n_rows")]
    for i, p in enumerate(_WELCH_PRIOS):
        aggs.append(F.max(F.when(g == p, F.col("n"))).alias(f"n{i}"))
        aggs.append(F.max(F.when(g == p, mean_j)).alias(f"m{i}"))
        aggs.append(F.max(F.when(g == p, var_j)).alias(f"v{i}"))
    red = m.agg(*aggs)
    # stage the scalar chain through NAMED columns (the r13 Janino lesson)
    for i in range(5):
        red = red.withColumn(
            f"w{i}", F.col(f"n{i}").cast("double") / F.col(f"v{i}")
        )
    red = red.withColumn(
        "w_tot",
        F.col("w0") + F.col("w1") + F.col("w2") + F.col("w3") + F.col("w4"),
    )
    red = red.withColumn(
        "mean_w",
        (
            F.col("w0") * F.col("m0")
            + F.col("w1") * F.col("m1")
            + F.col("w2") * F.col("m2")
            + F.col("w3") * F.col("m3")
            + F.col("w4") * F.col("m4")
        )
        / F.col("w_tot"),
    )
    for i in range(5):
        red = red.withColumn(
            f"a{i}",
            F.col(f"w{i}")
            * (F.col(f"m{i}") - F.col("mean_w"))
            * (F.col(f"m{i}") - F.col("mean_w")),
        ).withColumn(
            f"h{i}",
            (F.lit(1.0) - F.col(f"w{i}") / F.col("w_tot"))
            * (F.lit(1.0) - F.col(f"w{i}") / F.col("w_tot"))
            / (F.col(f"n{i}").cast("double") - F.lit(1.0)),
        )
    k = len(_WELCH_PRIOS)
    red = red.withColumn(
        "a_num",
        (F.col("a0") + F.col("a1") + F.col("a2") + F.col("a3") + F.col("a4"))
        / F.lit(float(k - 1)),
    ).withColumn(
        "h_tot",
        F.col("h0") + F.col("h1") + F.col("h2") + F.col("h3") + F.col("h4"),
    )
    b = F.lit(2.0 * (k - 2) / (k * k - 1.0)) * F.col("h_tot")
    f_star = F.col("a_num") / (F.lit(1.0) + b)
    df2 = F.lit(float(k * k - 1)) / (F.lit(3.0) * F.col("h_tot"))
    ok = F.lit(True)
    for i in range(5):
        ok = ok & (F.col(f"n{i}") >= 2) & (F.col(f"v{i}") > 0)
    return red.select(
        F.lit(k).cast("long").alias("k_groups"),
        "n_rows",
        F.when(ok, f_star).alias("f_welch"),
        F.lit(k - 1).cast("long").alias("df1"),
        F.when(ok, df2).alias("df2_welch"),
    )


def _sql_welch_anova() -> str:
    k = len(_WELCH_PRIOS)
    sel = []
    for i, p in enumerate(_WELCH_PRIOS):
        sel.append(f"MAX(CASE WHEN o_orderpriority = '{p}' THEN n END) AS n{i}")
        sel.append(f"MAX(CASE WHEN o_orderpriority = '{p}' THEN s / CAST(n AS DOUBLE) END) AS m{i}")
        sel.append(
            f"MAX(CASE WHEN o_orderpriority = '{p}' THEN"
            f" (CAST(n AS DOUBLE) * {sql_dec_to_double('ss_dec')} - s * s)"
            f" / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0)) END) AS v{i}"
        )
    ws = [f"CAST(n{i} AS DOUBLE) / v{i}" for i in range(k)]
    w_defs = ", ".join(f"{ws[i]} AS w{i}" for i in range(k))
    w_tot = " + ".join(f"w{i}" for i in range(k))
    mean_w = " + ".join(f"w{i} * m{i}" for i in range(k))
    a_sum = " + ".join(f"w{i} * (m{i} - mean_w) * (m{i} - mean_w)" for i in range(k))
    h_sum = " + ".join(
        f"(1.0 - w{i} / w_tot) * (1.0 - w{i} / w_tot) / (CAST(n{i} AS DOUBLE) - 1.0)"
        for i in range(k)
    )
    ok = " AND ".join(f"n{i} >= 2 AND v{i} > 0" for i in range(k))
    return f"""
WITH m AS (
  SELECT o_orderpriority,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS DECIMAL(38,0)) AS DOUBLE) AS s,
         CAST(SUM(CAST(CAST(ROUND(o_totalprice * 100) AS BIGINT)
                       * CAST(ROUND(o_totalprice * 100) AS BIGINT)
                       AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS ss_dec
  FROM orders GROUP BY 1
), red AS (
  SELECT CAST(SUM(n) AS BIGINT) AS n_rows, {", ".join(sel)}
  FROM m
), stage1 AS (
  SELECT *, {w_defs} FROM red
), stage2 AS (
  SELECT *, {w_tot} AS w_tot FROM stage1
), stage3 AS (
  SELECT *, ({mean_w}) / w_tot AS mean_w FROM stage2
), stage4 AS (
  SELECT *,
         ({a_sum}) / {float(k - 1)!r} AS a_num,
         ({h_sum}) AS h_tot
  FROM stage3
)
SELECT CAST({k} AS BIGINT) AS k_groups, n_rows,
       CASE WHEN {ok}
            THEN a_num / (1.0 + {2.0 * (k - 2) / (k * k - 1.0)!r} * h_tot) END AS f_welch,
       CAST({k - 1} AS BIGINT) AS df1,
       CASE WHEN {ok}
            THEN {float(k * k - 1)!r} / (3.0 * h_tot) END AS df2_welch
FROM stage4
"""


QUERIES = {
    "friedman_test": q_friedman_test,
    "welch_anova": q_welch_anova,
    "kappa_weighted": q_kappa_weighted,
    "dunn_posthoc_test": q_dunn_posthoc_test,
    "cmh_test": q_cmh_test,
    "breslow_day_test": q_breslow_day_test,
    "cuzick_trend_test": q_cuzick_trend_test,
    "conover_squared_ranks": q_conover_squared_ranks,
    "gwet_ac1": q_gwet_ac1,
    "cochrans_q_test": q_cochrans_q_test,
    "krippendorff_alpha": q_krippendorff_alpha,
    "quade_test": q_quade_test,
    "standardized_rate_mix": q_standardized_rate_mix,
    "fleiss_kappa": q_fleiss_kappa,
    "cohens_kappa": q_cohens_kappa,
    "kruskal_wallis": q_kruskal_wallis,
    "mantel_haenszel_or": q_mantel_haenszel_or,
    "cochran_armitage": q_cochran_armitage,
    "sprt_sequential": q_sprt_sequential,
    "anova_oneway": q_anova_oneway,
    "levene_brown_forsythe": q_levene_brown_forsythe,
    "cramers_v": q_cramers_v,
    "ab_srm_check": q_ab_srm_check,
}

ORACLE = {
    "friedman_test": _sql_friedman(),
    "welch_anova": _sql_welch_anova(),
    "kappa_weighted": _sql_kappa_weighted(),
    "dunn_posthoc_test": _sql_dunn(),
    "cmh_test": _sql_cmh(),
    "breslow_day_test": _sql_breslow_day(),
    "cuzick_trend_test": _sql_cuzick(),
    "conover_squared_ranks": _sql_conover(),
    "gwet_ac1": _sql_gwet_ac1(),
    "cochrans_q_test": _ORACLE_COCHRANS_Q,
    "krippendorff_alpha": _sql_krippendorff(),
    "quade_test": _sql_quade(),
    "standardized_rate_mix": _sql_standardized_rate(),
    "fleiss_kappa": _sql_fleiss(),
    "kruskal_wallis": _sql_kruskal_wallis(),
    "mantel_haenszel_or": _sql_mantel_haenszel(),
    "cochran_armitage": _ORACLE_COCHRAN_ARMITAGE,
    "sprt_sequential": _ORACLE_SPRT,
    "cohens_kappa": _ORACLE_COHENS_KAPPA,
    "anova_oneway": _ORACLE_ANOVA,
    "levene_brown_forsythe": _ORACLE_LEVENE,
    "cramers_v": _ORACLE_CRAMERS_V,
    "ab_srm_check": _ORACLE_SRM,
}
