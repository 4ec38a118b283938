"""Model-evaluation and diagnostic-statistics operators (round 9).

The time-series diagnostics (ACF, Ljung-Box, Theil's U), outlier and
agreement tests (Grubbs, Kendall's W, McNemar, Cronbach's alpha), scored-
classifier evaluation (exact ROC AUC, Brier decomposition), and the two
flat-sum survival companions of ``events.q_survival_kaplan_meier``
(Nelson-Aalen cumulative hazard, two-arm log-rank test).

Reference analog: none (extension scope — the reference is a batch
dashboard, SURVEY.md §2.7 engine additions). Every entry follows the house
exactness contract: moments are carried as exact integers or
floor-quantized decimal sums (``functions/exact.fsum`` — order-free,
rounding-mode-free), and every float that ships is ONE fixed IEEE op
sequence on those exact inputs, so the DuckDB oracle hash-matches bit-for-
bit at any partitioning.

Unit discipline for revenue series: daily/monthly revenue is summed in
CENTS (exact bigint), then scaled to $10M units (cents / 1e9) BEFORE any
squaring, so squared-deviation fsum sums stay far inside the 2^53 window
where DECIMAL→double conversion is correctly rounded on both engines (the
round-8 wide-decimal lesson). The scale knob moves with data size: at a
1000× deployment, bump the unit divisor the same way.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from us_flight_bigdata_dashboard_spark.functions.exact import (
    dec_to_double,
    fsum,
    sql_dec_to_double,
    sql_fsum,
)
from us_flight_bigdata_dashboard_spark.operators.dedup import _sql_hex_to_int
from us_flight_bigdata_dashboard_spark.operators.statistics import _cum_prev, _rank_prev_tied
from us_flight_bigdata_dashboard_spark.sources.catalog import load_table

# $10M units: daily revenue cents / 1e9 (see module docstring)
_UNIT = 1.0e9
_ACF_MAX_LAG = 7
_FS = 8  # fsum scale for squared-deviation sums in _UNIT units


def _daily_rev(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily revenue in exact cents: the shared diagnostic series.
    One hash agg collapses the scan to ≤ |days| rows (~2.4k at every SF),
    so everything downstream is domain-sized."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.groupBy(F.to_date("o_orderdate").alias("d")).agg(
        F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("bigint"))
        .cast("long")
        .alias("y")
    )


_SQL_DAILY = """
  SELECT CAST(o_orderdate AS DATE) AS d,
         CAST(SUM(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT) AS y
  FROM orders GROUP BY 1
"""


def _acf_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shared ACF pipeline: per lag k in 1..7, the autocorrelation
    r_k = sum((v_t - vbar)(v_lag - vbar)) / sum((v_t - vbar)^2) of the
    daily revenue series (v = cents/1e9). The series is ~2.4k rows after
    the daily agg, so the global row_number window and the k-shift
    self-join are DOMAIN-sized — the only data-sized stage is the first
    hash agg. Deviations are the same doubles on both engines (exact ints
    → one division sequence); both sums are floor-quantized (fsum) —
    order-free."""
    daily = _daily_rev(spark, sf_dir)
    w = Window.orderBy("d")
    ser = daily.select(
        F.row_number().over(w).alias("rn"),
        (F.col("y").cast("double") / F.lit(_UNIT)).alias("v"),
    )
    stats = ser.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        fsum(F.col("v"), scale=_FS).alias("sv"),
        fsum(F.col("v") * F.col("v"), scale=_FS).alias("sv2"),
    )
    mean = F.col("sv") / F.col("n").cast("double")
    den = F.col("sv2") - F.col("sv") * F.col("sv") / F.col("n").cast("double")
    base = stats.select("n", mean.alias("vbar"), den.alias("den"))
    lags = spark.range(1, _ACF_MAX_LAG + 1).select(F.col("id").cast("int").alias("lag"))
    a = ser.select(F.col("rn").alias("rn_a"), F.col("v").alias("v_t"))
    b = ser.select(F.col("rn").alias("rn_b"), F.col("v").alias("v_l"))
    pairs = (
        a.crossJoin(F.broadcast(lags))
        .join(b, F.col("rn_a") == F.col("rn_b") + F.col("lag"))
        .crossJoin(F.broadcast(base))
    )
    num = fsum(
        (F.col("v_t") - F.col("vbar")) * (F.col("v_l") - F.col("vbar")), scale=_FS
    )
    return (
        pairs.groupBy("lag")
        .agg(
            F.max("n").alias("n"),
            F.max("den").alias("den"),
            num.alias("num"),
        )
        .select(
            "lag",
            "n",
            (F.col("num") / F.col("den")).alias("acf"),
        )
    )


_SQL_ACF_FRAME = f"""
WITH daily AS ({_SQL_DAILY}
), ser AS (
  SELECT ROW_NUMBER() OVER (ORDER BY d) AS rn,
         CAST(y AS DOUBLE) / 1e9 AS v
  FROM daily
), stats AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         {sql_fsum("v", _FS)} AS sv,
         {sql_fsum("v * v", _FS)} AS sv2
  FROM ser
), base AS (
  SELECT n, sv / CAST(n AS DOUBLE) AS vbar,
         sv2 - sv * sv / CAST(n AS DOUBLE) AS den
  FROM stats
), lags AS (
  SELECT UNNEST(range(1, {_ACF_MAX_LAG + 1})) AS lag
), pairs AS (
  SELECT CAST(lag AS INT) AS lag, n, den,
         (a.v - vbar) * (b.v - vbar) AS prod
  FROM ser a
  CROSS JOIN lags
  JOIN ser b ON a.rn = b.rn + lag
  CROSS JOIN base
), agg AS (
  SELECT lag, MAX(n) AS n, MAX(den) AS den,
         {sql_fsum("prod", _FS)} AS num
  FROM pairs GROUP BY 1
)
SELECT lag, n, num / den AS acf FROM agg
"""


def q_acf_lags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Autocorrelation function of daily revenue, lags 1..7 — the first
    look at serial structure before any forecasting model (``events_holt*``
    downstream) is trusted; a slowly-decaying ACF says the naive iid
    revenue model underestimates variance. See ``_acf_frame`` for the
    exactness and scale-shape contract."""
    return _acf_frame(spark, sf_dir).orderBy("lag")


_ORACLE_ACF = _SQL_ACF_FRAME + "\nORDER BY lag"


def q_ljung_box_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ljung-Box portmanteau statistic Q = n(n+2) * sum_k r_k^2/(n-k)
    over the lag-1..7 ACF of daily revenue — the standard "is this series
    white noise" test (compare to chi^2_m). Pure arithmetic on the
    ``acf_lags`` frame: the per-lag terms are the same doubles on both
    engines and the m-term reduction is floor-quantized (a 7-row fsum), so
    the statistic is bit-stable. Scale shape: everything after the daily
    agg runs on ≤ m rows."""
    acf = _acf_frame(spark, sf_dir)
    nd = F.col("n").cast("double")
    term = (F.col("acf") * F.col("acf")) / (nd - F.col("lag").cast("double"))
    return acf.agg(
        F.max("n").cast("long").alias("n"),
        F.count(F.lit(1)).cast("long").alias("m"),
        (
            F.max(nd * (nd + F.lit(2.0)))
            * fsum(term, scale=12)
        ).alias("q_stat"),
    )


_ORACLE_LJUNG_BOX = f"""
WITH acf AS ({_SQL_ACF_FRAME})
SELECT CAST(MAX(n) AS BIGINT) AS n,
       CAST(COUNT(*) AS BIGINT) AS m,
       MAX(CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) + 2.0))
         * {sql_fsum("(acf * acf) / (CAST(n AS DOUBLE) - CAST(lag AS DOUBLE))", 12)}
         AS q_stat
FROM acf
"""


def q_theils_u_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil's U1 accuracy of the naive (last-value) forecast on MONTHLY
    revenue: U1 = sqrt(Σ(v_t−v_{t−1})²/n') / (sqrt(Σv_t²/n') +
    sqrt(Σv_{t−1}²/n')) — the scale-free benchmark every forecasting
    model must beat (U1 near 0 = predictable; near 1 = the naive carry-
    forward explains nothing). sqrt is correctly rounded by IEEE-754 on
    both engines (the ``events`` z-score precedent); the three sums are
    fsum-quantized in $10M units. Scale shape: one monthly hash agg, then
    an ~80-row lag window."""
    orders = load_table(spark, sf_dir, "orders")
    monthly = orders.groupBy(
        (F.year("o_orderdate") * 12 + F.month("o_orderdate")).alias("ym")
    ).agg(
        F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("bigint"))
        .cast("long")
        .alias("y")
    )
    w = Window.orderBy("ym")
    ser = monthly.select(
        "ym", (F.col("y").cast("double") / F.lit(_UNIT)).alias("v")
    ).withColumn("v_lag", F.lag("v").over(w))
    pairs = ser.filter(F.col("v_lag").isNotNull())
    agg = pairs.agg(
        F.count(F.lit(1)).cast("long").alias("n_pairs"),
        fsum((F.col("v") - F.col("v_lag")) * (F.col("v") - F.col("v_lag")), scale=_FS).alias("se"),
        fsum(F.col("v") * F.col("v"), scale=_FS).alias("sa"),
        fsum(F.col("v_lag") * F.col("v_lag"), scale=_FS).alias("sp"),
    )
    nd = F.col("n_pairs").cast("double")
    u1 = F.sqrt(F.col("se") / nd) / (
        F.sqrt(F.col("sa") / nd) + F.sqrt(F.col("sp") / nd)
    )
    return agg.select("n_pairs", u1.alias("u1"))


_ORACLE_THEILS_U = f"""
WITH monthly AS (
  SELECT YEAR(o_orderdate) * 12 + MONTH(o_orderdate) AS ym,
         CAST(SUM(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT) AS y
  FROM orders GROUP BY 1
), ser AS (
  SELECT ym, CAST(y AS DOUBLE) / 1e9 AS v,
         lag(CAST(y AS DOUBLE) / 1e9) OVER (ORDER BY ym) AS v_lag
  FROM monthly
), pairs AS (
  SELECT * FROM ser WHERE v_lag IS NOT NULL
), agg AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_pairs,
         {sql_fsum("(v - v_lag) * (v - v_lag)", _FS)} AS se,
         {sql_fsum("v * v", _FS)} AS sa,
         {sql_fsum("v_lag * v_lag", _FS)} AS sp
  FROM pairs
)
SELECT n_pairs,
       sqrt(se / CAST(n_pairs AS DOUBLE))
         / (sqrt(sa / CAST(n_pairs AS DOUBLE)) + sqrt(sp / CAST(n_pairs AS DOUBLE)))
         AS u1
FROM agg
"""


def q_grubbs_statistic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grubbs outlier statistic per region: G = max|v_t − v̄| / σ over the
    region's monthly revenue ($10M units), the classic single-outlier
    screen run before trend fits (``regression_ols``/``durbin_watson``) so
    one anomalous month doesn't steer the slope. Population σ =
    sqrt(Σv²/n − v̄²) from fsum-exact moments; the max of identical doubles
    is order-free; G is one division. Scale shape: scan → |region|×|month|
    hash agg; the two-pass moment+max join runs on the ~400-cell frame
    (broadcast moments)."""
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    monthly = (
        orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy(
            "r_name",
            (F.year("o_orderdate") * 12 + F.month("o_orderdate")).alias("ym"),
        )
        .agg(
            F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("bigint"))
            .cast("long")
            .alias("y")
        )
        .select("r_name", "ym", (F.col("y").cast("double") / F.lit(_UNIT)).alias("v"))
    )
    mom = monthly.groupBy("r_name").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        fsum("v", scale=_FS).alias("sv"),
        fsum(F.col("v") * F.col("v"), scale=_FS).alias("sv2"),
    )
    nd = F.col("n").cast("double")
    mean = F.col("sv") / nd
    joined = monthly.join(F.broadcast(mom), "r_name").select(
        "r_name",
        "n",
        "sv",
        "sv2",
        F.abs(F.col("v") - mean).alias("adev"),
    )
    out = joined.groupBy("r_name").agg(
        F.max("n").alias("n_months"),
        F.max("sv").alias("sv"),
        F.max("sv2").alias("sv2"),
        F.max("adev").alias("max_dev"),
    )
    nd2 = F.col("n_months").cast("double")
    mean2 = F.col("sv") / nd2
    sigma = F.sqrt(F.col("sv2") / nd2 - mean2 * mean2)
    return out.select(
        "r_name",
        "n_months",
        F.col("max_dev").alias("max_abs_dev"),
        sigma.alias("sigma"),
        (F.col("max_dev") / sigma).alias("g_stat"),
    ).orderBy("r_name")


_ORACLE_GRUBBS = f"""
WITH monthly AS (
  SELECT r_name,
         YEAR(o_orderdate) * 12 + MONTH(o_orderdate) AS ym,
         CAST(SUM(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS DOUBLE) / 1e9 AS v
  FROM orders
  JOIN customer ON o_custkey = c_custkey
  JOIN nation ON c_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey
  GROUP BY 1, 2
), mom AS (
  SELECT r_name, CAST(COUNT(*) AS BIGINT) AS n,
         {sql_fsum("v", _FS)} AS sv,
         {sql_fsum("v * v", _FS)} AS sv2
  FROM monthly GROUP BY 1
), joined AS (
  SELECT monthly.r_name, n, sv, sv2,
         abs(v - sv / CAST(n AS DOUBLE)) AS adev
  FROM monthly JOIN mom USING (r_name)
), outt AS (
  SELECT r_name, MAX(n) AS n_months, MAX(sv) AS sv, MAX(sv2) AS sv2,
         MAX(adev) AS max_dev
  FROM joined GROUP BY 1
)
SELECT r_name, n_months,
       max_dev AS max_abs_dev,
       sqrt(sv2 / CAST(n_months AS DOUBLE)
            - (sv / CAST(n_months AS DOUBLE)) * (sv / CAST(n_months AS DOUBLE))) AS sigma,
       max_dev / sqrt(sv2 / CAST(n_months AS DOUBLE)
            - (sv / CAST(n_months AS DOUBLE)) * (sv / CAST(n_months AS DOUBLE))) AS g_stat
FROM outt
ORDER BY r_name
"""


_KW_YM_LO = 1995 * 12 + 1  # 24 judge months: 1995-01 .. 1996-12
_KW_YM_HI = 1996 * 12 + 12


def q_kendalls_w(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kendall's coefficient of concordance W across m=24 monthly
    "judges": each month of 1995-1996 ranks the 25 nations by revenue
    (competition ranking, exact-cents compare, nationkey tie-break —
    zero-revenue months rank by key, documented determinism rather than
    midranks). W = 12·S / (m²(n³−n)) where S = Σ_i R_i² − n·(m(n+1)/2)²
    — S is computed from exact MOMENTS with the COUNTED n_items (the
    mean rank sum m(n+1)/2 = 12·(n+1) is an exact integer because m=24
    is even), so a schema/data change that alters the item count changes
    S correctly instead of silently skewing it against a baked-in n=25
    (ADVICE r9). Every quantity up to S is an exact INTEGER on both
    engines; W is one division. Near 1 = nations keep their revenue
    order month over month.

    Scale shape: scan → |nation|×|month| hash agg; the nation×month
    zero-fill spine and all ranking run on the 600-cell frame (25-row
    window partitions)."""
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    nation = load_table(spark, sf_dir, "nation").select("n_nationkey")
    ym = F.year("o_orderdate") * 12 + F.month("o_orderdate")
    rev = (
        orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .filter((ym >= _KW_YM_LO) & (ym <= _KW_YM_HI))
        .groupBy(F.col("c_nationkey").alias("nk"), ym.alias("ym"))
        .agg(
            F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("bigint"))
            .cast("long")
            .alias("y")
        )
    )
    months = spark.range(_KW_YM_LO, _KW_YM_HI + 1).select(
        F.col("id").cast("int").alias("ym")
    )
    spine = nation.select(F.col("n_nationkey").alias("nk")).crossJoin(
        F.broadcast(months)
    )
    dense = spine.join(rev, ["nk", "ym"], "left").select(
        "nk", "ym", F.coalesce("y", F.lit(0)).alias("y")
    )
    w = Window.partitionBy("ym").orderBy(F.desc("y"), F.asc("nk"))
    ranked = dense.withColumn("rk", F.row_number().over(w))
    sums = ranked.groupBy("nk").agg(F.sum("rk").cast("long").alias("r_i"))
    m = _KW_YM_HI - _KW_YM_LO + 1
    assert m % 2 == 0, "mean rank sum m(n+1)/2 must stay an exact integer"
    moments = sums.agg(
        F.count(F.lit(1)).cast("long").alias("n_items"),
        F.sum(F.col("r_i") * F.col("r_i")).cast("long").alias("sum_r2"),
    )
    mu = F.lit(m // 2) * (F.col("n_items") + F.lit(1))
    agg = moments.select(
        "n_items",
        (F.col("sum_r2") - F.col("n_items") * mu * mu).cast("long").alias("s"),
    )
    n = F.col("n_items").cast("double")
    wstat = (F.lit(12.0) * F.col("s").cast("double")) / (
        F.lit(float(m * m)) * (n * n * n - n)
    )
    return agg.select(
        F.lit(m).cast("long").alias("m_judges"),
        "n_items",
        "s",
        wstat.alias("w_stat"),
    )


_ORACLE_KENDALLS_W = f"""
WITH rev AS (
  SELECT c_nationkey AS nk,
         YEAR(o_orderdate) * 12 + MONTH(o_orderdate) AS ym,
         CAST(SUM(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT) AS y
  FROM orders JOIN customer ON o_custkey = c_custkey
  WHERE YEAR(o_orderdate) * 12 + MONTH(o_orderdate) BETWEEN {_KW_YM_LO} AND {_KW_YM_HI}
  GROUP BY 1, 2
), months AS (
  SELECT UNNEST(range({_KW_YM_LO}, {_KW_YM_HI + 1})) AS ym
), spine AS (
  SELECT n_nationkey AS nk, CAST(ym AS INT) AS ym FROM nation CROSS JOIN months
), dense AS (
  SELECT spine.nk, spine.ym, COALESCE(rev.y, 0) AS y
  FROM spine LEFT JOIN rev ON spine.nk = rev.nk AND spine.ym = rev.ym
), ranked AS (
  SELECT nk, ROW_NUMBER() OVER (PARTITION BY ym ORDER BY y DESC, nk ASC) AS rk
  FROM dense
), sums AS (
  SELECT nk, CAST(SUM(rk) AS BIGINT) AS r_i FROM ranked GROUP BY 1
), moments AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_items,
         CAST(SUM(r_i * r_i) AS BIGINT) AS sum_r2
  FROM sums
), agg AS (
  SELECT n_items,
         CAST(sum_r2 - n_items * (12 * (n_items + 1)) * (12 * (n_items + 1))
              AS BIGINT) AS s
  FROM moments
)
SELECT CAST(24 AS BIGINT) AS m_judges, n_items, s,
       (12.0 * CAST(s AS DOUBLE))
         / ({float(24 * 24)!r} * (CAST(n_items AS DOUBLE) * CAST(n_items AS DOUBLE)
            * CAST(n_items AS DOUBLE) - CAST(n_items AS DOUBLE))) AS w_stat
FROM agg
"""


_MCN_THRESHOLD = 150000.0
_MCN_SPLIT = "1998-01-01"


def q_mcnemar_paired(spark: SparkSession, sf_dir: str) -> DataFrame:
    """McNemar test on paired per-customer binaries: did the customer
    place a >${t:,.0f} order BEFORE {s} (h1) vs ON/AFTER it (h2)? The test
    uses only the DISCORDANT cells — b = (h1,¬h2): lapsed big spenders,
    c = (¬h1,h2): new big spenders — χ² = (b−c)²/(b+c), plus the
    continuity-corrected (|b−c|−1)²/(b+c). The standard paired before/
    after test where a two-proportion z-test would be wrong (same
    customers in both periods). b and c are exact integers; both
    statistics are one IEEE sequence. Degenerate-input contract: with
    ZERO discordant pairs (b+c=0) both statistics are emitted as 0.0
    (no evidence of change) rather than NULL, mirrored in the oracle
    (ADVICE r9).

    Scale shape: one per-customer max-flag hash agg (map-side combinable
    booleans), then a scalar count — nothing bigger than the customer
    domain ever shuffles."""
    orders = load_table(spark, sf_dir, "orders")
    big = F.col("o_totalprice") > F.lit(_MCN_THRESHOLD)
    pre = F.col("o_orderdate") < F.lit(_MCN_SPLIT).cast("timestamp")
    per_cust = orders.groupBy("o_custkey").agg(
        F.max(F.when(big & pre, 1).otherwise(0)).alias("h1"),
        F.max(F.when(big & ~pre, 1).otherwise(0)).alias("h2"),
    )
    agg = per_cust.agg(
        F.sum(F.when((F.col("h1") == 1) & (F.col("h2") == 0), 1).otherwise(0))
        .cast("long")
        .alias("b"),
        F.sum(F.when((F.col("h1") == 0) & (F.col("h2") == 1), 1).otherwise(0))
        .cast("long")
        .alias("c"),
    )
    bd = F.col("b").cast("double")
    cd = F.col("c").cast("double")
    no_discord = (F.col("b") + F.col("c")) == 0
    return agg.select(
        "b",
        "c",
        F.when(no_discord, F.lit(0.0))
        .otherwise((bd - cd) * (bd - cd) / (bd + cd))
        .alias("chi2"),
        F.when(no_discord, F.lit(0.0))
        .otherwise(
            (F.abs(bd - cd) - F.lit(1.0))
            * (F.abs(bd - cd) - F.lit(1.0))
            / (bd + cd)
        )
        .alias("chi2_cc"),
    )
q_mcnemar_paired.__doc__ = q_mcnemar_paired.__doc__ and q_mcnemar_paired.__doc__.format(t=_MCN_THRESHOLD, s=_MCN_SPLIT)


_ORACLE_MCNEMAR = f"""
WITH per_cust AS (
  SELECT o_custkey,
         MAX(CASE WHEN o_totalprice > {_MCN_THRESHOLD!r}
                   AND o_orderdate < TIMESTAMP '{_MCN_SPLIT}' THEN 1 ELSE 0 END) AS h1,
         MAX(CASE WHEN o_totalprice > {_MCN_THRESHOLD!r}
                   AND NOT (o_orderdate < TIMESTAMP '{_MCN_SPLIT}') THEN 1 ELSE 0 END) AS h2
  FROM orders GROUP BY 1
), agg AS (
  SELECT CAST(SUM(CASE WHEN h1 = 1 AND h2 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS b,
         CAST(SUM(CASE WHEN h1 = 0 AND h2 = 1 THEN 1 ELSE 0 END) AS BIGINT) AS c
  FROM per_cust
)
SELECT b, c,
       CASE WHEN b + c = 0 THEN 0.0 ELSE
         (CAST(b AS DOUBLE) - CAST(c AS DOUBLE)) * (CAST(b AS DOUBLE) - CAST(c AS DOUBLE))
           / (CAST(b AS DOUBLE) + CAST(c AS DOUBLE)) END AS chi2,
       CASE WHEN b + c = 0 THEN 0.0 ELSE
         (abs(CAST(b AS DOUBLE) - CAST(c AS DOUBLE)) - 1.0)
           * (abs(CAST(b AS DOUBLE) - CAST(c AS DOUBLE)) - 1.0)
           / (CAST(b AS DOUBLE) + CAST(c AS DOUBLE)) END AS chi2_cc
FROM agg
"""


def q_cronbachs_alpha(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cronbach's alpha internal-consistency of a 3-item "premium order"
    scale (i1 = urgent/high priority, i2 = totalprice > $150k, i3 =
    fulfilled status): α = k/(k−1) · (1 − Σσ²_item / σ²_total), the
    standard check that indicator items measure one construct before a
    composite score ships. Every variance is computed as
    (n·Σx² − (Σx)²)/n² from EXACT integer sums (items are 0/1, the total
    score ≤ 3, so all cross-sums are small integers); α itself is one
    IEEE sequence on those integers.

    Scale shape: a single map-side-combinable hash agg of 7 integer sums
    over the scan — no joins, no windows, nothing domain-sized at all."""
    orders = load_table(spark, sf_dir, "orders")
    i1 = F.when(
        F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1
    ).otherwise(0)
    i2 = F.when(F.col("o_totalprice") > F.lit(_MCN_THRESHOLD), 1).otherwise(0)
    i3 = F.when(F.col("o_orderstatus") == "F", 1).otherwise(0)
    x = i1 + i2 + i3
    agg = orders.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(i1).cast("long").alias("s1"),
        F.sum(i2).cast("long").alias("s2"),
        F.sum(i3).cast("long").alias("s3"),
        F.sum(x).cast("long").alias("sx"),
        F.sum(x * x).cast("long").alias("sx2"),
    )
    nd = F.col("n").cast("double")

    def _var(s_col, s2_col):
        return (nd * s2_col - s_col * s_col) / (nd * nd)

    # binary items: Σx² = Σx, so item variance needs only the sum
    v1 = _var(F.col("s1").cast("double"), F.col("s1").cast("double"))
    v2 = _var(F.col("s2").cast("double"), F.col("s2").cast("double"))
    v3 = _var(F.col("s3").cast("double"), F.col("s3").cast("double"))
    vt = _var(F.col("sx").cast("double"), F.col("sx2").cast("double"))
    alpha = F.lit(1.5) * (F.lit(1.0) - (v1 + v2 + v3) / vt)
    return agg.select(
        "n",
        (v1 + v2 + v3).alias("var_items_sum"),
        vt.alias("var_total"),
        alpha.alias("alpha"),
    )


_ORACLE_CRONBACH = f"""
WITH agg AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS s1,
         CAST(SUM(CASE WHEN o_totalprice > {_MCN_THRESHOLD!r} THEN 1 ELSE 0 END) AS BIGINT) AS s2,
         CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS s3,
         CAST(SUM((CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END)
                + (CASE WHEN o_totalprice > {_MCN_THRESHOLD!r} THEN 1 ELSE 0 END)
                + (CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END)) AS BIGINT) AS sx,
         CAST(SUM(((CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END)
                 + (CASE WHEN o_totalprice > {_MCN_THRESHOLD!r} THEN 1 ELSE 0 END)
                 + (CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END))
                * ((CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END)
                 + (CASE WHEN o_totalprice > {_MCN_THRESHOLD!r} THEN 1 ELSE 0 END)
                 + (CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END))) AS BIGINT) AS sx2
  FROM orders
)
SELECT n,
       ((CAST(n AS DOUBLE) * CAST(s1 AS DOUBLE) - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE)) / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE))
      + (CAST(n AS DOUBLE) * CAST(s2 AS DOUBLE) - CAST(s2 AS DOUBLE) * CAST(s2 AS DOUBLE)) / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE))
      + (CAST(n AS DOUBLE) * CAST(s3 AS DOUBLE) - CAST(s3 AS DOUBLE) * CAST(s3 AS DOUBLE)) / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)))
         AS var_items_sum,
       (CAST(n AS DOUBLE) * CAST(sx2 AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE))
         AS var_total,
       1.5 * (1.0 -
         ((CAST(n AS DOUBLE) * CAST(s1 AS DOUBLE) - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE)) / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE))
        + (CAST(n AS DOUBLE) * CAST(s2 AS DOUBLE) - CAST(s2 AS DOUBLE) * CAST(s2 AS DOUBLE)) / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE))
        + (CAST(n AS DOUBLE) * CAST(s3 AS DOUBLE) - CAST(s3 AS DOUBLE) * CAST(s3 AS DOUBLE)) / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)))
         / ((CAST(n AS DOUBLE) * CAST(sx2 AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE))))
         AS alpha
FROM agg
"""





# ---------------------------------------------------------------------------
# Scored-classifier evaluation: exact ROC AUC and Brier decomposition
# ---------------------------------------------------------------------------

_AUC_BUCKETS = 1024
_BRIER_BINS = 10


def q_roc_auc_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT ROC AUC of order value as a score for predicting urgency —
    the rank-sum identity AUC = P(score_pos > score_neg) + P(=)/2 =
    sum_v cp_v * (2*cneg_below_v + cn_v) / (2*n1*n0), the threshold-free
    companion of ``model_gains_lift`` (same score/label construction,
    statistics.py). Ties are handled EXACTLY via the per-value (cp, cn)
    aggregation — no midrank floats ever materialize; the numerator and
    denominator are exact integers and AUC is one division.

    Scale shape: the per-value agg is data-sized; the cumulative
    negatives-below count uses the ``global_rank_bucketed`` decomposition
    (1024 value-range buckets -> per-bucket totals -> broadcast prefix
    offsets -> within-bucket running sums) instead of a single-task
    ORDER BY window; the oracle's plain window proves the decomposition
    value-identical. Integer bound: the numerator is < 2*n1*n0, which
    exceeds int64 past ~2e9 orders, so it accumulates as DECIMAL(38,0)
    on BOTH engines (Spark decimal sum / DuckDB HUGEINT terms cast to
    DECIMAL(38,0)) — no silent wraparound at 100 TB (ADVICE r9)."""
    orders = load_table(spark, sf_dir, "orders").select(
        F.col("o_totalprice").alias("v"),
        F.when(F.col("o_orderpriority") == "1-URGENT", F.lit(1))
        .otherwise(F.lit(0))
        .alias("pos"),
    )
    per_v = orders.groupBy("v").agg(
        F.sum("pos").cast("long").alias("cp"),
        F.sum(F.lit(1) - F.col("pos")).cast("long").alias("cn"),
    )
    stats = per_v.agg(
        F.min("v").alias("_mn"), F.max("v").alias("_mx")
    )
    based = per_v.crossJoin(F.broadcast(stats))
    b = F.coalesce(
        F.least(
            F.lit(_AUC_BUCKETS - 1),
            F.floor(
                (F.col("v") - F.col("_mn"))
                * _AUC_BUCKETS
                / F.nullif(F.col("_mx") - F.col("_mn"), F.lit(0.0))
            ),
        ).cast("int"),
        F.lit(0),
    )
    bucketed = based.withColumn("_b", b)
    offsets = (
        bucketed.groupBy("_b")
        .agg(F.sum("cn").cast("long").alias("_bn"))
        .withColumn(
            "_off",
            F.coalesce(
                F.sum("_bn").over(
                    Window.orderBy("_b").rowsBetween(Window.unboundedPreceding, -1)
                ),
                F.lit(0),
            ).cast("long"),
        )
        .select("_b", "_off")
    )
    w_in = Window.partitionBy("_b").orderBy("v").rowsBetween(
        Window.unboundedPreceding, -1
    )
    ranked = bucketed.join(F.broadcast(offsets), "_b").withColumn(
        "cneg_below",
        F.col("_off") + F.coalesce(F.sum("cn").over(w_in), F.lit(0)),
    )
    agg = ranked.agg(
        F.sum("cp").cast("long").alias("n_pos"),
        F.sum("cn").cast("long").alias("n_neg"),
        F.sum(
            F.col("cp").cast("decimal(18,0)")
            * (F.lit(2) * F.col("cneg_below") + F.col("cn")).cast("decimal(20,0)")
        )
        .cast("decimal(38,0)")
        .alias("num2"),
    )
    return agg.select(
        "n_pos",
        "n_neg",
        (
            F.col("num2").cast("double")
            / (
                F.lit(2.0)
                * F.col("n_pos").cast("double")
                * F.col("n_neg").cast("double")
            )
        ).alias("auc"),
    )


_ORACLE_ROC_AUC = """
WITH per_v AS (
  SELECT o_totalprice AS v,
         CAST(SUM(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END) AS BIGINT) AS cp,
         CAST(SUM(CASE WHEN o_orderpriority = '1-URGENT' THEN 0 ELSE 1 END) AS BIGINT) AS cn
  FROM orders GROUP BY 1
), ranked AS (
  SELECT cp, cn,
         CAST(COALESCE(SUM(cn) OVER (ORDER BY v
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
           AS cneg_below
  FROM per_v
), agg AS (
  SELECT CAST(SUM(cp) AS BIGINT) AS n_pos,
         CAST(SUM(cn) AS BIGINT) AS n_neg,
         CAST(SUM(CAST(cp AS HUGEINT) * (2 * CAST(cneg_below AS HUGEINT) + cn))
              AS DECIMAL(38,0)) AS num2
  FROM ranked
)
SELECT n_pos, n_neg,
       CAST(num2 AS DOUBLE)
         / (2.0 * CAST(n_pos AS DOUBLE) * CAST(n_neg AS DOUBLE)) AS auc
FROM agg
"""


def _score_cum_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shared scored-classifier cumulative frame (round 13): the
    ``roc_auc_exact`` score/label construction (o_totalprice predicting
    urgency) as a per-distinct-value frame carrying BOTH cumulative
    strictly-below counts (cpos_below, cneg_below) plus the exact totals
    — the distributed order-statistics substrate for every threshold
    metric. The cumulatives use the same 1024-bucket
    ``global_rank_bucketed`` decomposition as roc_auc_exact (per-bucket
    totals → broadcast prefix offsets → within-bucket running sums), so
    no single-task global window exists; the plain-window oracles of the
    consuming entries prove the decomposition value-identical."""
    orders = load_table(spark, sf_dir, "orders").select(
        F.col("o_totalprice").alias("v"),
        F.when(F.col("o_orderpriority") == "1-URGENT", F.lit(1))
        .otherwise(F.lit(0))
        .alias("pos"),
    )
    per_v = orders.groupBy("v").agg(
        F.sum("pos").cast("long").alias("cp"),
        F.sum(F.lit(1) - F.col("pos")).cast("long").alias("cn"),
    )
    stats = per_v.agg(F.min("v").alias("_mn"), F.max("v").alias("_mx"))
    based = per_v.crossJoin(F.broadcast(stats))
    b = F.coalesce(
        F.least(
            F.lit(_AUC_BUCKETS - 1),
            F.floor(
                (F.col("v") - F.col("_mn"))
                * _AUC_BUCKETS
                / F.nullif(F.col("_mx") - F.col("_mn"), F.lit(0.0))
            ),
        ).cast("int"),
        F.lit(0),
    )
    bucketed = based.withColumn("_b", b)
    offsets = (
        bucketed.groupBy("_b")
        .agg(
            F.sum("cp").cast("long").alias("_bp"),
            F.sum("cn").cast("long").alias("_bn"),
        )
        .select(
            "_b",
            F.coalesce(
                F.sum("_bp").over(
                    Window.orderBy("_b").rowsBetween(Window.unboundedPreceding, -1)
                ),
                F.lit(0),
            )
            .cast("long")
            .alias("_offp"),
            F.coalesce(
                F.sum("_bn").over(
                    Window.orderBy("_b").rowsBetween(Window.unboundedPreceding, -1)
                ),
                F.lit(0),
            )
            .cast("long")
            .alias("_offn"),
        )
    )
    w_in = Window.partitionBy("_b").orderBy("v").rowsBetween(
        Window.unboundedPreceding, -1
    )
    tot = per_v.agg(
        F.sum("cp").cast("long").alias("n_pos"),
        F.sum("cn").cast("long").alias("n_neg"),
    )
    return (
        bucketed.join(F.broadcast(offsets), "_b")
        .select(
            "v",
            "cp",
            "cn",
            (F.col("_offp") + F.coalesce(F.sum("cp").over(w_in), F.lit(0)))
            .cast("long")
            .alias("cpos_below"),
            (F.col("_offn") + F.coalesce(F.sum("cn").over(w_in), F.lit(0)))
            .cast("long")
            .alias("cneg_below"),
        )
        .crossJoin(F.broadcast(tot))
    )


_AP_FSUM_SCALE = 7  # Σterm ≤ n_pos; n_pos·10^7 < 2^53 to ~9·10^8 positives


def q_average_precision_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT average precision (the area under the precision-recall
    curve by the standard sum-over-positives definition) of order value
    predicting urgency — the class-imbalance-honest companion of
    ``roc_auc_exact``: AUC-ROC is insensitive to the positive-class
    rarity that dominates retrieval/filter tuning, AP is exactly the
    metric that collapses when positives are rare. AP = (1/P) Σ_k
    rel_k · Prec@k over the score-DESC ranking.

    Tie convention (documented, deterministic): within a tied score
    block, positives rank BEFORE negatives — the OPTIMISTIC AP, the
    well-defined closed form on grouped data: a block with cp positives
    after (Cp, Cn) cumulative (positives, negatives) above it
    contributes Σ_{i=1..cp} (Cp+i)/(Cp+Cn+i). Exactness: Cp/Cn/i are
    exact integers (< 2^53 ⇒ correctly-rounded doubles); each term is
    ONE division; the cross-positive reduction is floor-quantized
    (``fsum`` scale 7: Σterm ≤ n_pos keeps the sum inside the 2^53
    window to ~9·10^8 positives); AP is one final division. The
    per-positive explode materializes exactly n_pos rows
    (sequence(1, cp) per block — bounded by the positives themselves).

    Scale shape: the shared ``_score_cum_frame`` bucketed-decomposition
    cumulative (no single-task window), one bounded explode, one
    map-side-combinable reduce; the oracle's plain DESC window +
    generate_series proves the decomposition value-identical.

    Reference analog: none (engine addition, SURVEY.md §2.7)."""
    frame = _score_cum_frame(spark, sf_dir)
    blocks = frame.filter(F.col("cp") > 0).select(
        (F.col("n_pos") - F.col("cpos_below") - F.col("cp")).alias("above_p"),
        (F.col("n_neg") - F.col("cneg_below") - F.col("cn")).alias("above_n"),
        "cp",
        "n_pos",
        "n_neg",
    )
    terms = blocks.select(
        "n_pos",
        "n_neg",
        F.explode(F.sequence(F.lit(1), F.col("cp"))).alias("i"),
        "above_p",
        "above_n",
    ).select(
        "n_pos",
        "n_neg",
        (
            (F.col("above_p") + F.col("i")).cast("double")
            / (F.col("above_p") + F.col("above_n") + F.col("i")).cast("double")
        ).alias("term"),
    )
    return terms.groupBy("n_pos", "n_neg").agg(
        (fsum("term", scale=_AP_FSUM_SCALE) / F.col("n_pos").cast("double")).alias(
            "average_precision"
        ),
        (
            F.col("n_pos").cast("double")
            / (F.col("n_pos") + F.col("n_neg")).cast("double")
        ).alias("prevalence_baseline"),
    )


_ORACLE_AVERAGE_PRECISION = f"""
WITH per_v AS (
  SELECT o_totalprice AS v,
         CAST(SUM(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END) AS BIGINT) AS cp,
         CAST(SUM(CASE WHEN o_orderpriority = '1-URGENT' THEN 0 ELSE 1 END) AS BIGINT) AS cn
  FROM orders GROUP BY 1
), tot AS (
  SELECT CAST(SUM(cp) AS BIGINT) AS n_pos, CAST(SUM(cn) AS BIGINT) AS n_neg
  FROM per_v
), ranked AS (
  SELECT cp,
         CAST(COALESCE(SUM(cp) OVER (ORDER BY v DESC
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS above_p,
         CAST(COALESCE(SUM(cn) OVER (ORDER BY v DESC
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS above_n
  FROM per_v
), terms AS (
  SELECT n_pos, n_neg,
         CAST(above_p + u.i AS DOUBLE)
           / CAST(above_p + above_n + u.i AS DOUBLE) AS term
  FROM ranked CROSS JOIN tot, UNNEST(generate_series(1, cp)) AS u(i)
  WHERE cp > 0
)
SELECT n_pos, n_neg,
       ({sql_fsum("term", scale=_AP_FSUM_SCALE)} / CAST(n_pos AS DOUBLE))
         AS average_precision,
       CAST(n_pos AS DOUBLE) / CAST(n_pos + n_neg AS DOUBLE)
         AS prevalence_baseline
FROM terms
GROUP BY n_pos, n_neg
"""


def q_youden_j_threshold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Youden-J optimal operating point of the order-value score for
    urgency: over candidate thresholds t (every distinct score,
    predicting positive when v ≥ t), maximize J(t) = TPR(t) − FPR(t) —
    the standard threshold-selection rule that turns the
    ``roc_auc_exact`` curve into a deployable cutoff (the ROC point
    farthest above the chance diagonal, Youden 1950).

    Exactness: the argmax never touches a float — J(t₁) > J(t₂) ⟺
    m(t₁) > m(t₂) with the INTEGER cross-multiplication
    m = pos_ge·n_neg − neg_ge·n_pos (carried DECIMAL(38,0); |m| ≤ N²
    is exact past 10^18 rows), and the argmax itself is two exact
    aggregates — max(m), then min(v) among ties (smallest threshold =
    most sensitive operating point, the documented deterministic
    tie-break) — NOT a global sort. TPR/FPR/J ship as one division
    each on exact integers. Degenerate contract: an empty class
    (n_pos = 0 or n_neg = 0) → every rate NULL under explicit guards.

    Scale shape: the shared ``_score_cum_frame`` bucketed cumulative,
    one map-side-combinable max, one broadcast filter + min — no
    single-task ORDER BY anywhere; the oracle's plain-window argmin
    proves it.

    Reference analog: none (engine addition, SURVEY.md §2.7)."""
    frame = _score_cum_frame(spark, sf_dir)
    scored = frame.select(
        "v",
        "n_pos",
        "n_neg",
        (F.col("n_pos") - F.col("cpos_below")).alias("pos_ge"),
        (F.col("n_neg") - F.col("cneg_below")).alias("neg_ge"),
        (
            (F.col("n_pos") - F.col("cpos_below")).cast("decimal(19,0)")
            * F.col("n_neg").cast("decimal(19,0)")
            - (F.col("n_neg") - F.col("cneg_below")).cast("decimal(19,0)")
            * F.col("n_pos").cast("decimal(19,0)")
        )
        .cast("decimal(38,0)")
        .alias("m"),
    )
    mx = scored.agg(F.max("m").alias("m_best"))
    best = (
        scored.join(F.broadcast(mx), F.col("m") == F.col("m_best"))
        .groupBy("n_pos", "n_neg")
        .agg(
            F.min("v").alias("threshold"),
            F.min_by("pos_ge", "v").cast("long").alias("tp"),
            F.min_by("neg_ge", "v").cast("long").alias("fp"),
        )
    )
    pos_ok = F.col("n_pos") > 0
    neg_ok = F.col("n_neg") > 0
    tpr = F.col("tp").cast("double") / F.col("n_pos").cast("double")
    fpr = F.col("fp").cast("double") / F.col("n_neg").cast("double")
    return best.select(
        "threshold",
        "n_pos",
        "n_neg",
        "tp",
        "fp",
        F.when(pos_ok, tpr).alias("tpr"),
        F.when(neg_ok, fpr).alias("fpr"),
        F.when(pos_ok & neg_ok, tpr - fpr).alias("youden_j"),
    )


_ORACLE_YOUDEN = """
WITH per_v AS (
  SELECT o_totalprice AS v,
         CAST(SUM(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END) AS BIGINT) AS cp,
         CAST(SUM(CASE WHEN o_orderpriority = '1-URGENT' THEN 0 ELSE 1 END) AS BIGINT) AS cn
  FROM orders GROUP BY 1
), tot AS (
  SELECT CAST(SUM(cp) AS BIGINT) AS n_pos, CAST(SUM(cn) AS BIGINT) AS n_neg
  FROM per_v
), scored AS (
  SELECT v, n_pos, n_neg,
         n_pos - CAST(COALESCE(SUM(cp) OVER (ORDER BY v
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS pos_ge,
         n_neg - CAST(COALESCE(SUM(cn) OVER (ORDER BY v
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS neg_ge
  FROM per_v CROSS JOIN tot
), m AS (
  SELECT v, n_pos, n_neg, pos_ge, neg_ge,
         CAST(CAST(pos_ge AS DECIMAL(19,0)) * CAST(n_neg AS DECIMAL(19,0))
            - CAST(neg_ge AS DECIMAL(19,0)) * CAST(n_pos AS DECIMAL(19,0))
            AS DECIMAL(38,0)) AS m
  FROM scored
), best AS (
  SELECT n_pos, n_neg,
         MIN(v) AS threshold,
         CAST(MIN_BY(pos_ge, v) AS BIGINT) AS tp,
         CAST(MIN_BY(neg_ge, v) AS BIGINT) AS fp
  FROM m
  WHERE m = (SELECT MAX(m) FROM m)
  GROUP BY 1, 2
)
SELECT threshold, n_pos, n_neg, tp, fp,
       CASE WHEN n_pos > 0 THEN CAST(tp AS DOUBLE) / CAST(n_pos AS DOUBLE) END AS tpr,
       CASE WHEN n_neg > 0 THEN CAST(fp AS DOUBLE) / CAST(n_neg AS DOUBLE) END AS fpr,
       CASE WHEN n_pos > 0 AND n_neg > 0
            THEN CAST(tp AS DOUBLE) / CAST(n_pos AS DOUBLE)
               - CAST(fp AS DOUBLE) / CAST(n_neg AS DOUBLE) END AS youden_j
FROM best
"""


def q_brier_decomposition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Murphy decomposition of the Brier score for the min-max-binned
    order-value score predicting urgency: forecast probability per bin =
    the bin midpoint p_b = (b+0.5)/10; Brier = REL - RES + UNC with
    REL = sum n_b (p_b - o_b)^2 / n    (calibration error),
    RES = sum n_b (o_b - obar)^2 / n   (discrimination),
    UNC = obar (1 - obar)              (irreducible base-rate noise).
    Every o_b and obar is a ratio of exact integers; p_b is an exact
    decimal literal; the two 10-term reductions are floor-quantized
    (fsum) so the whole decomposition is bit-stable. The exact identity
    Brier = REL - RES + UNC ships pre-verified by construction.

    Scale shape: one data-sized bucket agg (min/max broadcast), then a
    10-row frame."""
    orders = load_table(spark, sf_dir, "orders").select(
        F.col("o_totalprice").alias("v"),
        F.when(F.col("o_orderpriority") == "1-URGENT", F.lit(1))
        .otherwise(F.lit(0))
        .alias("pos"),
    )
    stats = orders.agg(F.min("v").alias("_mn"), F.max("v").alias("_mx"))
    based = orders.crossJoin(F.broadcast(stats))
    b = F.coalesce(
        F.least(
            F.lit(_BRIER_BINS - 1),
            F.floor(
                (F.col("v") - F.col("_mn"))
                * _BRIER_BINS
                / F.nullif(F.col("_mx") - F.col("_mn"), F.lit(0.0))
            ),
        ).cast("int"),
        F.lit(0),
    )
    per_b = based.groupBy(b.alias("b")).agg(
        F.count(F.lit(1)).cast("long").alias("n_b"),
        F.sum("pos").cast("long").alias("pos_b"),
    )
    w_all = Window.partitionBy()
    tot = per_b.select(
        "b",
        "n_b",
        "pos_b",
        F.sum("n_b").over(w_all).cast("long").alias("n"),
        F.sum("pos_b").over(w_all).cast("long").alias("npos"),
    )
    p_b = (F.col("b").cast("double") + F.lit(0.5)) / F.lit(float(_BRIER_BINS))
    o_b = F.col("pos_b").cast("double") / F.col("n_b").cast("double")
    obar = F.col("npos").cast("double") / F.col("n").cast("double")
    share = F.col("n_b").cast("double") / F.col("n").cast("double")
    agg = tot.agg(
        F.max("n").alias("n"),
        F.max(obar).alias("base_rate"),
        fsum(share * (p_b - o_b) * (p_b - o_b), scale=15).alias("reliability"),
        fsum(share * (o_b - obar) * (o_b - obar), scale=15).alias("resolution"),
    )
    unc = F.col("base_rate") * (F.lit(1.0) - F.col("base_rate"))
    return agg.select(
        "n",
        "base_rate",
        "reliability",
        "resolution",
        unc.alias("uncertainty"),
        (F.col("reliability") - F.col("resolution") + unc).alias("brier"),
    )


_ORACLE_BRIER = f"""
WITH stats AS (
  SELECT MIN(o_totalprice) AS mn, MAX(o_totalprice) AS mx FROM orders
), based AS (
  SELECT COALESCE(LEAST({_BRIER_BINS - 1},
           CAST(FLOOR((o_totalprice - mn) * {_BRIER_BINS}
                / NULLIF(mx - mn, 0.0)) AS INT)), 0) AS b,
         CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END AS pos
  FROM orders CROSS JOIN stats
), per_b AS (
  SELECT b, CAST(COUNT(*) AS BIGINT) AS n_b, CAST(SUM(pos) AS BIGINT) AS pos_b
  FROM based GROUP BY 1
), tot AS (
  SELECT b, n_b, pos_b,
         CAST(SUM(n_b) OVER () AS BIGINT) AS n,
         CAST(SUM(pos_b) OVER () AS BIGINT) AS npos
  FROM per_b
), agg AS (
  SELECT MAX(n) AS n,
         MAX(CAST(npos AS DOUBLE) / CAST(n AS DOUBLE)) AS base_rate,
         {sql_fsum("(CAST(n_b AS DOUBLE) / CAST(n AS DOUBLE))"
                   " * ((CAST(b AS DOUBLE) + 0.5) / 10.0 - CAST(pos_b AS DOUBLE) / CAST(n_b AS DOUBLE))"
                   " * ((CAST(b AS DOUBLE) + 0.5) / 10.0 - CAST(pos_b AS DOUBLE) / CAST(n_b AS DOUBLE))", 15)}
           AS reliability,
         {sql_fsum("(CAST(n_b AS DOUBLE) / CAST(n AS DOUBLE))"
                   " * (CAST(pos_b AS DOUBLE) / CAST(n_b AS DOUBLE) - CAST(npos AS DOUBLE) / CAST(n AS DOUBLE))"
                   " * (CAST(pos_b AS DOUBLE) / CAST(n_b AS DOUBLE) - CAST(npos AS DOUBLE) / CAST(n AS DOUBLE))", 15)}
           AS resolution
  FROM tot
)
SELECT n, base_rate, reliability, resolution,
       base_rate * (1.0 - base_rate) AS uncertainty,
       reliability - resolution + base_rate * (1.0 - base_rate) AS brier
FROM agg
"""


# ---------------------------------------------------------------------------
# Survival companions of events.q_survival_kaplan_meier (flat-sum, no
# sequential recursion): Nelson-Aalen cumulative hazard and two-arm log-rank
# ---------------------------------------------------------------------------


def q_survival_nelson_aalen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nelson-Aalen cumulative hazard of user lifetime (hours from first
    to last event, right-censored in the final 24h — the EXACT same
    risk-set construction as ``events.q_survival_kaplan_meier``):
    H(t) = sum_{t_i <= t} d_i/n_i. Where KM's cumulative PRODUCT needs a
    sequential pass (applyInPandas + recursive-CTE oracle), the ADDITIVE
    hazard admits a fully order-free formulation: each output row's sum
    is an independent floor-quantized reduction over the domain-sized
    curve self-join (t_a >= t_b), so neither engine ever runs a
    float cumsum (the DuckDB segment-tree windowed-SUM pitfall never
    arises). Curve rows are bounded by the observation window in hours
    (~720), so the self-join is at most ~500k domain cells at ANY data
    scale."""
    events = load_table(spark, sf_dir, "events")
    s = F.unix_timestamp(F.col("ts"))
    per_user = events.groupBy("user_id").agg(
        F.min(s).alias("first_s"), F.max(s).alias("last_s")
    )
    horizon = events.agg(F.max(s).alias("max_s"))
    users = per_user.crossJoin(F.broadcast(horizon)).select(
        F.expr("(last_s - first_s) DIV 3600").alias("t"),
        (F.col("last_s") < F.col("max_s") - F.lit(86400))
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
        ).cast("long").alias("n_risk"),
    ).filter(F.col("d") > 0)
    a = curve.select(
        F.col("t").alias("t_a"),
        F.col("d").alias("d_a"),
        F.col("n_risk").alias("n_a"),
    )
    b = curve.select(
        F.col("t").alias("t_b"), F.col("d").alias("d_b"), F.col("n_risk").alias("n_b")
    )
    return (
        a.join(b, F.col("t_a") >= F.col("t_b"))
        .groupBy("t_a")
        .agg(
            F.max("n_a").alias("n_risk"),
            F.max("d_a").alias("n_events"),
            fsum(
                F.col("d_b").cast("double") / F.col("n_b").cast("double"),
                scale=12,
            ).alias("cum_hazard"),
        )
        .select(
            F.col("t_a").alias("t_hours"), "n_risk", "n_events", "cum_hazard"
        )
        .orderBy("t_hours")
    )


_SQL_SURV_CURVE = """
  per_user AS (
    SELECT user_id,
           CAST(floor(MIN(epoch(CAST(ts AS TIMESTAMP)))) AS BIGINT) AS first_s,
           CAST(floor(MAX(epoch(CAST(ts AS TIMESTAMP)))) AS BIGINT) AS last_s
    FROM events GROUP BY 1
  ), users AS (
    SELECT (last_s - first_s) // 3600 AS t,
           CASE WHEN last_s < (SELECT MAX(last_s) FROM per_user) - 86400
                THEN 1 ELSE 0 END AS churned
    FROM per_user
  ), per_t AS (
    SELECT t, CAST(COUNT(*) AS BIGINT) AS cnt, CAST(SUM(churned) AS BIGINT) AS d
    FROM users GROUP BY 1
  ), curve0 AS (
    SELECT t, d,
           CAST(SUM(cnt) OVER () AS BIGINT)
             - CAST(COALESCE(SUM(cnt) OVER (ORDER BY t
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
             AS n_risk
    FROM per_t
  ), curve AS (
    SELECT t, d, n_risk FROM curve0 WHERE d > 0
  )
"""


_ORACLE_NELSON_AALEN = f"""
WITH {_SQL_SURV_CURVE}
SELECT a.t AS t_hours,
       MAX(a.n_risk) AS n_risk,
       MAX(a.d) AS n_events,
       {sql_fsum("CAST(b.d AS DOUBLE) / CAST(b.n_risk AS DOUBLE)", 12)} AS cum_hazard
FROM curve a JOIN curve b ON a.t >= b.t
GROUP BY a.t
ORDER BY t_hours
"""


def q_survival_logrank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-arm log-rank test on user lifetime, arms = user_id parity (the
    deterministic stand-in for an A/B assignment hash): at each event
    time, O1 observed arm-1 churns vs E1 = sum d*n1/n expected under the
    null, with hypergeometric variance V = sum d*(n1/n)*(1-n1/n)*(n-d)/
    (n-1); chi2 = (O1-E1)^2/V. Unlike KM's cumulative product, every term
    is a FLAT per-time quantity, so the whole test is two fsum reductions
    over the domain-sized curve — order-free on both engines. Risk sets
    per arm come from the same window construction as KM (curve rows are
    bounded by the observation window, ~720)."""
    events = load_table(spark, sf_dir, "events")
    s = F.unix_timestamp(F.col("ts"))
    per_user = events.groupBy("user_id").agg(
        F.min(s).alias("first_s"), F.max(s).alias("last_s")
    )
    horizon = events.agg(F.max(s).alias("max_s"))
    users = per_user.crossJoin(F.broadcast(horizon)).select(
        (F.col("user_id") % 2).cast("int").alias("arm"),
        F.expr("(last_s - first_s) DIV 3600").alias("t"),
        (F.col("last_s") < F.col("max_s") - F.lit(86400))
        .cast("long")
        .alias("churned"),
    )
    per_t = users.groupBy("t").agg(
        F.count(F.lit(1)).cast("long").alias("cnt"),
        F.sum("churned").cast("long").alias("d"),
        F.sum(F.when(F.col("arm") == 1, 1).otherwise(0)).cast("long").alias("cnt1"),
        F.sum(F.when(F.col("arm") == 1, F.col("churned")).otherwise(0))
        .cast("long")
        .alias("d1"),
    )
    w_all = Window.partitionBy()
    w_prev = Window.orderBy("t").rowsBetween(Window.unboundedPreceding, -1)
    curve = per_t.select(
        "t",
        "d",
        "d1",
        (
            F.sum("cnt").over(w_all)
            - F.coalesce(F.sum("cnt").over(w_prev), F.lit(0))
        ).cast("long").alias("n"),
        (
            F.sum("cnt1").over(w_all)
            - F.coalesce(F.sum("cnt1").over(w_prev), F.lit(0))
        ).cast("long").alias("n1"),
    ).filter((F.col("d") > 0) & (F.col("n") > 1))
    dd = F.col("d").cast("double")
    nd = F.col("n").cast("double")
    n1d = F.col("n1").cast("double")
    agg = curve.agg(
        F.count(F.lit(1)).cast("long").alias("n_times"),
        F.sum("d1").cast("long").alias("o1"),
        fsum(dd * n1d / nd, scale=12).alias("e1"),
        fsum(
            dd * (n1d / nd) * (F.lit(1.0) - n1d / nd) * (nd - dd) / (nd - F.lit(1.0)),
            scale=12,
        ).alias("v"),
    )
    o1d = F.col("o1").cast("double")
    return agg.select(
        "n_times",
        "o1",
        "e1",
        "v",
        ((o1d - F.col("e1")) * (o1d - F.col("e1")) / F.col("v")).alias("chi2"),
    )


_ORACLE_LOGRANK = f"""
WITH per_user AS (
  SELECT user_id,
         CAST(floor(MIN(epoch(CAST(ts AS TIMESTAMP)))) AS BIGINT) AS first_s,
         CAST(floor(MAX(epoch(CAST(ts AS TIMESTAMP)))) AS BIGINT) AS last_s
  FROM events GROUP BY 1
), users AS (
  SELECT CAST(user_id % 2 AS INT) AS arm,
         (last_s - first_s) // 3600 AS t,
         CASE WHEN last_s < (SELECT MAX(last_s) FROM per_user) - 86400
              THEN 1 ELSE 0 END AS churned
  FROM per_user
), per_t AS (
  SELECT t, CAST(COUNT(*) AS BIGINT) AS cnt, CAST(SUM(churned) AS BIGINT) AS d,
         CAST(SUM(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS cnt1,
         CAST(SUM(CASE WHEN arm = 1 THEN churned ELSE 0 END) AS BIGINT) AS d1
  FROM users GROUP BY 1
), curve AS (
  SELECT t, d, d1,
         CAST(SUM(cnt) OVER () AS BIGINT)
           - CAST(COALESCE(SUM(cnt) OVER (ORDER BY t
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS n,
         CAST(SUM(cnt1) OVER () AS BIGINT)
           - CAST(COALESCE(SUM(cnt1) OVER (ORDER BY t
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS n1
  FROM per_t
), filt AS (
  SELECT * FROM curve WHERE d > 0 AND n > 1
), agg AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_times,
         CAST(SUM(d1) AS BIGINT) AS o1,
         {sql_fsum("CAST(d AS DOUBLE) * CAST(n1 AS DOUBLE) / CAST(n AS DOUBLE)", 12)} AS e1,
         {sql_fsum("CAST(d AS DOUBLE) * (CAST(n1 AS DOUBLE) / CAST(n AS DOUBLE))"
                   " * (1.0 - CAST(n1 AS DOUBLE) / CAST(n AS DOUBLE))"
                   " * (CAST(n AS DOUBLE) - CAST(d AS DOUBLE))"
                   " / (CAST(n AS DOUBLE) - 1.0)", 12)} AS v
  FROM filt
)
SELECT n_times, o1, e1, v,
       (CAST(o1 AS DOUBLE) - e1) * (CAST(o1 AS DOUBLE) - e1) / v AS chi2
FROM agg
"""


# ---------------------------------------------------------------------------
# Ordered-alternative and monotone-trend tests; structural-break and
# influence diagnostics on the monthly OLS fits
# ---------------------------------------------------------------------------


def q_page_trend_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Page's L test for an ORDERED alternative on the same m=24-judge /
    n=25-item rank frame as ``kendalls_w``: L = sum_i c_i * R_i with the
    hypothesized item order c_i = nationkey rank — where Kendall's W asks
    "do the judges agree at all", Page's L asks "do they agree with THIS
    specific ordering". L and its null moments E[L] = m*n*(n+1)^2/4,
    Var[L] = m*n^2*(n+1)*(n^2-1)/144 are exact integers/rationals; the
    z-score is one IEEE sequence. Scale shape: identical to kendalls_w —
    everything after the |nation|x|month| agg runs on the 600-cell
    frame."""
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    nation = load_table(spark, sf_dir, "nation").select("n_nationkey")
    ym = F.year("o_orderdate") * 12 + F.month("o_orderdate")
    rev = (
        orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .filter((ym >= _KW_YM_LO) & (ym <= _KW_YM_HI))
        .groupBy(F.col("c_nationkey").alias("nk"), ym.alias("ym"))
        .agg(
            F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("bigint"))
            .cast("long")
            .alias("y")
        )
    )
    months = spark.range(_KW_YM_LO, _KW_YM_HI + 1).select(
        F.col("id").cast("int").alias("ym")
    )
    spine = nation.select(F.col("n_nationkey").alias("nk")).crossJoin(
        F.broadcast(months)
    )
    dense = spine.join(rev, ["nk", "ym"], "left").select(
        "nk", "ym", F.coalesce("y", F.lit(0)).alias("y")
    )
    w = Window.partitionBy("ym").orderBy(F.desc("y"), F.asc("nk"))
    ranked = dense.withColumn("rk", F.row_number().over(w))
    sums = ranked.groupBy("nk").agg(F.sum("rk").cast("long").alias("r_i"))
    # hypothesized order: nationkey ascending -> c_i = dense rank of nk
    ow = Window.orderBy("nk")
    ordered = sums.withColumn("c_i", F.row_number().over(ow).cast("long"))
    agg = ordered.agg(
        F.count(F.lit(1)).cast("long").alias("n_items"),
        F.sum(F.col("c_i") * F.col("r_i")).cast("long").alias("l_stat"),
    )
    m = float(_KW_YM_HI - _KW_YM_LO + 1)
    nd = F.col("n_items").cast("double")
    e_l = F.lit(m) * nd * (nd + 1.0) * (nd + 1.0) / F.lit(4.0)
    var_l = (
        F.lit(m) * nd * nd * (nd + 1.0) * (nd * nd - 1.0) / F.lit(144.0)
    )
    return agg.select(
        F.lit(int(m)).cast("long").alias("m_judges"),
        "n_items",
        "l_stat",
        ((F.col("l_stat").cast("double") - e_l) / F.sqrt(var_l)).alias("z_stat"),
    )


_ORACLE_PAGE_TREND = f"""
WITH rev AS (
  SELECT c_nationkey AS nk,
         YEAR(o_orderdate) * 12 + MONTH(o_orderdate) AS ym,
         CAST(SUM(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT) AS y
  FROM orders JOIN customer ON o_custkey = c_custkey
  WHERE YEAR(o_orderdate) * 12 + MONTH(o_orderdate) BETWEEN {_KW_YM_LO} AND {_KW_YM_HI}
  GROUP BY 1, 2
), months AS (
  SELECT UNNEST(range({_KW_YM_LO}, {_KW_YM_HI + 1})) AS ym
), spine AS (
  SELECT n_nationkey AS nk, CAST(ym AS INT) AS ym FROM nation CROSS JOIN months
), dense AS (
  SELECT spine.nk, spine.ym, COALESCE(rev.y, 0) AS y
  FROM spine LEFT JOIN rev ON spine.nk = rev.nk AND spine.ym = rev.ym
), ranked AS (
  SELECT nk, ROW_NUMBER() OVER (PARTITION BY ym ORDER BY y DESC, nk ASC) AS rk
  FROM dense
), sums AS (
  SELECT nk, CAST(SUM(rk) AS BIGINT) AS r_i FROM ranked GROUP BY 1
), ordered_s AS (
  SELECT r_i, CAST(ROW_NUMBER() OVER (ORDER BY nk) AS BIGINT) AS c_i FROM sums
), agg AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_items,
         CAST(SUM(c_i * r_i) AS BIGINT) AS l_stat
  FROM ordered_s
)
SELECT CAST(24 AS BIGINT) AS m_judges, n_items, l_stat,
       (CAST(l_stat AS DOUBLE)
        - 24.0 * CAST(n_items AS DOUBLE) * (CAST(n_items AS DOUBLE) + 1.0)
          * (CAST(n_items AS DOUBLE) + 1.0) / 4.0)
       / sqrt(24.0 * CAST(n_items AS DOUBLE) * CAST(n_items AS DOUBLE)
              * (CAST(n_items AS DOUBLE) + 1.0)
              * (CAST(n_items AS DOUBLE) * CAST(n_items AS DOUBLE) - 1.0) / 144.0)
         AS z_stat
FROM agg
"""


def q_seasonal_mann_kendall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonal Mann-Kendall trend test on monthly global revenue: the
    Hirsch-Slack variant that asks "is revenue trending ACROSS YEARS,
    month against same month?" — pooling only within-season pairs so a
    seasonal cycle cannot masquerade as (or mask) a trend, which is
    exactly the failure mode of running plain ``mann_kendall_trend`` on
    a seasonal series. The hydrology standard for trend in seasonal
    data. S = Σ_m S_m over the 12 calendar-month seasons; Var = Σ_m of
    each season's tie-corrected null variance (seasons independent
    under H0); continuity-corrected Z against the literal normal 5%
    point.

    Exactness: revenue compared in CENTS, so each sign and every tie
    moment is an exact integer; Var and Z are one IEEE sequence on
    them. Scale shape: the scan collapses to the (year, month) frame;
    the within-season i<j pair lattice is C(|years|, 2)·12 domain
    cells."""
    orders = load_table(spark, sf_dir, "orders")
    monthly = orders.groupBy(
        F.year("o_orderdate").alias("yr"), F.month("o_orderdate").alias("mth")
    ).agg(
        F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("bigint"))
        .cast("long")
        .alias("y")
    )
    a = monthly.select(
        F.col("mth").alias("m_a"), F.col("yr").alias("yr_a"), F.col("y").alias("y_a")
    )
    b = monthly.select(
        F.col("mth").alias("m_b"), F.col("yr").alias("yr_b"), F.col("y").alias("y_b")
    )
    pairs = a.join(
        b, (F.col("m_a") == F.col("m_b")) & (F.col("yr_a") < F.col("yr_b"))
    )
    s_agg = pairs.agg(
        F.sum(
            F.when(F.col("y_b") > F.col("y_a"), 1)
            .when(F.col("y_b") < F.col("y_a"), -1)
            .otherwise(0)
        )
        .cast("long")
        .alias("s")
    )
    per_season = monthly.groupBy("mth").agg(F.count(F.lit(1)).cast("long").alias("n"))
    ties = (
        monthly.groupBy("mth", "y")
        .agg(F.count(F.lit(1)).cast("long").alias("t"))
        .groupBy("mth")
        .agg(
            F.sum(F.col("t") * (F.col("t") - 1) * (F.lit(2) * F.col("t") + 5))
            .cast("long")
            .alias("tie_term")
        )
    )
    var_rows = per_season.join(ties, "mth")
    nd = F.col("n").cast("double")
    var_m = (
        nd * (nd - 1.0) * (F.lit(2.0) * nd + 5.0)
        - F.col("tie_term").cast("double")
    ) / F.lit(18.0)
    var_agg = var_rows.agg(
        F.count(F.lit(1)).cast("int").alias("n_seasons"),
        fsum(var_m, scale=6).alias("var_s"),
    )
    out = s_agg.crossJoin(F.broadcast(var_agg))
    sd = F.col("s").cast("double")
    z = (
        F.when(F.col("s") > 0, (sd - 1.0) / F.sqrt(F.col("var_s")))
        .when(F.col("s") < 0, (sd + 1.0) / F.sqrt(F.col("var_s")))
        .otherwise(F.lit(0.0))
    )
    return out.select(
        "n_seasons",
        "s",
        "var_s",
        z.alias("z_stat"),
        (F.abs(z) > F.lit(1.959964)).cast("int").alias("significant_5pct"),
    )


_ORACLE_SEASONAL_MK = f"""
WITH monthly AS (
  SELECT YEAR(o_orderdate) AS yr, MONTH(o_orderdate) AS mth,
         CAST(SUM(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT) AS y
  FROM orders GROUP BY 1, 2
), s_agg AS (
  SELECT CAST(SUM(CASE WHEN b.y > a.y THEN 1 WHEN b.y < a.y THEN -1 ELSE 0 END) AS BIGINT) AS s
  FROM monthly a JOIN monthly b ON a.mth = b.mth AND a.yr < b.yr
), per_season AS (
  SELECT mth, CAST(COUNT(*) AS BIGINT) AS n FROM monthly GROUP BY 1
), ties AS (
  SELECT mth, CAST(SUM(t * (t - 1) * (2 * t + 5)) AS BIGINT) AS tie_term
  FROM (SELECT mth, y, CAST(COUNT(*) AS BIGINT) AS t FROM monthly GROUP BY 1, 2)
  GROUP BY 1
), var_rows AS (
  SELECT per_season.mth,
         (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0) * (2.0 * CAST(n AS DOUBLE) + 5.0)
          - CAST(tie_term AS DOUBLE)) / 18.0 AS var_m
  FROM per_season JOIN ties ON per_season.mth = ties.mth
), var_agg AS (
  SELECT CAST(COUNT(*) AS INT) AS n_seasons,
         {sql_fsum("var_m", scale=6)} AS var_s
  FROM var_rows
)
SELECT n_seasons, s, var_s,
       CASE WHEN s > 0 THEN (CAST(s AS DOUBLE) - 1.0) / sqrt(var_s)
            WHEN s < 0 THEN (CAST(s AS DOUBLE) + 1.0) / sqrt(var_s)
            ELSE 0.0 END AS z_stat,
       CAST(CASE WHEN ABS(CASE WHEN s > 0 THEN (CAST(s AS DOUBLE) - 1.0) / sqrt(var_s)
                  WHEN s < 0 THEN (CAST(s AS DOUBLE) + 1.0) / sqrt(var_s)
                  ELSE 0.0 END) > 1.959964 THEN 1 ELSE 0 END AS INT) AS significant_5pct
FROM s_agg CROSS JOIN var_agg
"""


def q_mann_kendall_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Kendall monotone-trend test on monthly global revenue:
    S = sum_{i<j} sign(y_j - y_i) over the ~80-month series, with the
    exact tie-corrected null variance Var[S] = [n(n-1)(2n+5) -
    sum_g t_g(t_g-1)(2t_g+5)]/18 and the continuity-corrected
    Z = (S -/+ 1)/sqrt(Var) — the distribution-free trend test that
    pairs with ``theil_sen_trend``'s slope estimate (statistics.py). S
    and the tie term are exact integers (revenue compared in CENTS);
    Z is one IEEE sequence. Scale shape: the scan collapses to the
    month frame; the i<j pair join is C(80,2) ~ 3.2k domain cells."""
    orders = load_table(spark, sf_dir, "orders")
    monthly = orders.groupBy(
        (F.year("o_orderdate") * 12 + F.month("o_orderdate")).alias("ym")
    ).agg(
        F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("bigint"))
        .cast("long")
        .alias("y")
    )
    a = monthly.select(F.col("ym").alias("ym_a"), F.col("y").alias("y_a"))
    b = monthly.select(F.col("ym").alias("ym_b"), F.col("y").alias("y_b"))
    pairs = a.join(b, F.col("ym_a") < F.col("ym_b"))
    s_agg = pairs.agg(
        F.sum(
            F.when(F.col("y_b") > F.col("y_a"), 1)
            .when(F.col("y_b") < F.col("y_a"), -1)
            .otherwise(0)
        )
        .cast("long")
        .alias("s")
    )
    ties = (
        monthly.groupBy("y")
        .agg(F.count(F.lit(1)).cast("long").alias("t"))
        .agg(
            F.sum(
                F.col("t") * (F.col("t") - 1) * (F.lit(2) * F.col("t") + 5)
            )
            .cast("long")
            .alias("tie_term")
        )
    )
    n_row = monthly.agg(F.count(F.lit(1)).cast("long").alias("n"))
    out = s_agg.crossJoin(F.broadcast(ties)).crossJoin(F.broadcast(n_row))
    nd = F.col("n").cast("double")
    var_s = (
        nd * (nd - 1.0) * (F.lit(2.0) * nd + 5.0)
        - F.col("tie_term").cast("double")
    ) / F.lit(18.0)
    sd = F.col("s").cast("double")
    z = (
        F.when(F.col("s") > 0, (sd - 1.0) / F.sqrt(var_s))
        .when(F.col("s") < 0, (sd + 1.0) / F.sqrt(var_s))
        .otherwise(F.lit(0.0))
    )
    return out.select("n", "s", var_s.alias("var_s"), z.alias("z_stat"))


_ORACLE_MANN_KENDALL = """
WITH monthly AS (
  SELECT YEAR(o_orderdate) * 12 + MONTH(o_orderdate) AS ym,
         CAST(SUM(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT) AS y
  FROM orders GROUP BY 1
), s_agg AS (
  SELECT CAST(SUM(CASE WHEN b.y > a.y THEN 1 WHEN b.y < a.y THEN -1 ELSE 0 END) AS BIGINT) AS s
  FROM monthly a JOIN monthly b ON a.ym < b.ym
), ties AS (
  SELECT CAST(SUM(t * (t - 1) * (2 * t + 5)) AS BIGINT) AS tie_term
  FROM (SELECT CAST(COUNT(*) AS BIGINT) AS t FROM monthly GROUP BY y)
), nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM monthly)
SELECT n, s,
       (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0) * (2.0 * CAST(n AS DOUBLE) + 5.0)
        - CAST(tie_term AS DOUBLE)) / 18.0 AS var_s,
       CASE WHEN s > 0 THEN (CAST(s AS DOUBLE) - 1.0)
                 / sqrt((CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0) * (2.0 * CAST(n AS DOUBLE) + 5.0)
                         - CAST(tie_term AS DOUBLE)) / 18.0)
            WHEN s < 0 THEN (CAST(s AS DOUBLE) + 1.0)
                 / sqrt((CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0) * (2.0 * CAST(n AS DOUBLE) + 5.0)
                         - CAST(tie_term AS DOUBLE)) / 18.0)
            ELSE 0.0 END AS z_stat
FROM s_agg, ties, nn
"""


_CHOW_SPLIT_YM = 1998 * 12 + 1  # structural-break candidate: 1998-01


def _ols_moment_cols(prefix: str):
    n = F.col(f"{prefix}n").cast("double")
    sx = F.col(f"{prefix}sx").cast("double")
    sy = F.col(f"{prefix}sy")
    sxy = F.col(f"{prefix}sxy")
    sxx = F.col(f"{prefix}sxx").cast("double")
    syy = F.col(f"{prefix}syy")
    return (syy - sy * sy / n) - (sxy - sx * sy / n) * (sxy - sx * sy / n) / (
        sxx - sx * sx / n
    )


def q_chow_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chow structural-break test per region at {d}: fit the monthly-
    revenue OLS trend before, after, and pooled, and test whether the two
    segments share one line — F = ((SSR_p − SSR_1 − SSR_2)/2) /
    ((SSR_1 + SSR_2)/(n−4)); the standard "did the trend change here"
    companion of ``durbin_watson``'s misspecification check. All six
    moment sets come from ONE hash agg (conditional sums per segment —
    pooled moments are segment sums, exact by additivity); x is the
    integer month, y is revenue in $10M units, the y-moments are
    floor-quantized, and every SSR is the same computational-formula IEEE
    sequence on both engines. Scale shape: scan → |region|×|month| cells;
    the moment algebra runs on 5 rows."""
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    monthly = (
        orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy(
            "r_name",
            (F.year("o_orderdate") * 12 + F.month("o_orderdate")).alias("x"),
        )
        .agg(
            F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("bigint"))
            .cast("long")
            .alias("cents")
        )
        .select(
            "r_name",
            "x",
            (F.col("x") < _CHOW_SPLIT_YM).alias("pre"),
            (F.col("cents").cast("double") / F.lit(_UNIT)).alias("v"),
        )
    )

    def seg(cond, label):
        xd = F.col("x").cast("long")
        return [
            F.sum(F.when(cond, 1).otherwise(0)).cast("long").alias(f"{label}n"),
            F.sum(F.when(cond, xd).otherwise(0)).cast("long").alias(f"{label}sx"),
            fsum(F.when(cond, F.col("v")).otherwise(0.0), scale=_FS).alias(f"{label}sy"),
            fsum(
                F.when(cond, F.col("v") * xd.cast("double")).otherwise(0.0),
                scale=_FS,
            ).alias(f"{label}sxy"),
            F.sum(F.when(cond, xd * xd).otherwise(0)).cast("long").alias(f"{label}sxx"),
            fsum(
                F.when(cond, F.col("v") * F.col("v")).otherwise(0.0), scale=_FS
            ).alias(f"{label}syy"),
        ]

    m = monthly.groupBy("r_name").agg(
        *seg(F.col("pre"), "a_"),
        *seg(~F.col("pre"), "b_"),
        *seg(F.lit(True), "p_"),
    )
    ssr1 = _ols_moment_cols("a_")
    ssr2 = _ols_moment_cols("b_")
    ssrp = _ols_moment_cols("p_")
    n_tot = (F.col("a_n") + F.col("b_n")).cast("double")
    f_stat = ((ssrp - ssr1 - ssr2) / F.lit(2.0)) / (
        (ssr1 + ssr2) / (n_tot - F.lit(4.0))
    )
    return m.select(
        "r_name",
        F.col("a_n").alias("n_pre"),
        F.col("b_n").alias("n_post"),
        (ssr1 + ssr2).alias("ssr_segments"),
        ssrp.alias("ssr_pooled"),
        f_stat.alias("f_stat"),
    ).orderBy("r_name")
q_chow_test.__doc__ = q_chow_test.__doc__ and q_chow_test.__doc__.format(d="1998-01")


def _sql_chow() -> str:
    def seg(cond, label):
        return f"""
         CAST(SUM(CASE WHEN {cond} THEN 1 ELSE 0 END) AS BIGINT) AS {label}n,
         CAST(SUM(CASE WHEN {cond} THEN x ELSE 0 END) AS BIGINT) AS {label}sx,
         {sql_fsum(f"CASE WHEN {cond} THEN v ELSE 0.0 END", _FS)} AS {label}sy,
         {sql_fsum(f"CASE WHEN {cond} THEN v * CAST(x AS DOUBLE) ELSE 0.0 END", _FS)} AS {label}sxy,
         CAST(SUM(CASE WHEN {cond} THEN x * x ELSE 0 END) AS BIGINT) AS {label}sxx,
         {sql_fsum(f"CASE WHEN {cond} THEN v * v ELSE 0.0 END", _FS)} AS {label}syy"""

    def ssr(label):
        n = f"CAST({label}n AS DOUBLE)"
        sx = f"CAST({label}sx AS DOUBLE)"
        sxx = f"CAST({label}sxx AS DOUBLE)"
        return (
            f"(({label}syy - {label}sy * {label}sy / {n})"
            f" - ({label}sxy - {sx} * {label}sy / {n})"
            f" * ({label}sxy - {sx} * {label}sy / {n})"
            f" / ({sxx} - {sx} * {sx} / {n}))"
        )

    return f"""
WITH monthly AS (
  SELECT r_name,
         CAST(YEAR(o_orderdate) * 12 + MONTH(o_orderdate) AS BIGINT) AS x,
         YEAR(o_orderdate) * 12 + MONTH(o_orderdate) < {_CHOW_SPLIT_YM} AS pre,
         CAST(SUM(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS DOUBLE) / 1e9 AS v
  FROM orders
  JOIN customer ON o_custkey = c_custkey
  JOIN nation ON c_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey
  GROUP BY 1, 2, 3
), m AS (
  SELECT r_name,{seg("pre", "a_")},{seg("NOT pre", "b_")},{seg("TRUE", "p_")}
  FROM monthly GROUP BY 1
)
SELECT r_name,
       a_n AS n_pre, b_n AS n_post,
       {ssr("a_")} + {ssr("b_")} AS ssr_segments,
       {ssr("p_")} AS ssr_pooled,
       (({ssr("p_")} - {ssr("a_")} - {ssr("b_")}) / 2.0)
         / (({ssr("a_")} + {ssr("b_")}) / (CAST(a_n + b_n AS DOUBLE) - 4.0)) AS f_stat
FROM m
ORDER BY r_name
"""


REG_INFLUENCE_TOP = 10


def q_regression_influence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OLS influence diagnostics on the per-region monthly trend (the
    ``durbin_watson`` fit): per month, the leverage h_t = 1/n +
    (x−x̄)²/Sxx, the residual, and Cook's distance D = e²h /
    (k·s²·(1−h)²) with k=2 and s² = SSR/(n−2) — the standard "which
    observation is steering my fit" screen; the top {k} most influential
    (region, month) cells ship. Everything derives from exact integer
    x-moments and floor-quantized y-moments — slope, residuals, leverage
    and D are one IEEE sequence each. Scale shape: scan →
    |region|×|month| cells; the diagnostic math is a broadcast moment
    join over the ~400-cell frame."""
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    monthly = (
        orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy(
            "r_name",
            (F.year("o_orderdate") * 12 + F.month("o_orderdate")).alias("x"),
        )
        .agg(
            F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("bigint"))
            .cast("long")
            .alias("cents")
        )
        .select("r_name", "x", (F.col("cents").cast("double") / F.lit(_UNIT)).alias("v"))
    )
    xd = F.col("x").cast("long")
    mom = monthly.groupBy("r_name").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(xd).cast("long").alias("sx"),
        fsum("v", scale=_FS).alias("sy"),
        fsum(F.col("v") * xd.cast("double"), scale=_FS).alias("sxy"),
        F.sum(xd * xd).cast("long").alias("sxx"),
        fsum(F.col("v") * F.col("v"), scale=_FS).alias("syy"),
    )
    nd = F.col("n").cast("double")
    sxd = F.col("sx").cast("double")
    sxxd = F.col("sxx").cast("double")
    sxx_c = sxxd - sxd * sxd / nd
    slope = (F.col("sxy") - sxd * F.col("sy") / nd) / sxx_c
    intercept = (F.col("sy") - slope * sxd) / nd
    ssr = (F.col("syy") - F.col("sy") * F.col("sy") / nd) - (
        F.col("sxy") - sxd * F.col("sy") / nd
    ) * (F.col("sxy") - sxd * F.col("sy") / nd) / sxx_c
    coef = mom.select(
        "r_name",
        "n",
        slope.alias("b"),
        intercept.alias("a"),
        (sxd / nd).alias("xbar"),
        sxx_c.alias("sxx_c"),
        (ssr / (nd - F.lit(2.0))).alias("s2"),
    )
    joined = monthly.join(F.broadcast(coef), "r_name")
    e = F.col("v") - (F.col("a") + F.col("b") * F.col("x").cast("double"))
    h = F.lit(1.0) / F.col("n").cast("double") + (
        (F.col("x").cast("double") - F.col("xbar"))
        * (F.col("x").cast("double") - F.col("xbar"))
    ) / F.col("sxx_c")
    cooks = (e * e * h) / (
        F.lit(2.0) * F.col("s2") * (F.lit(1.0) - h) * (F.lit(1.0) - h)
    )
    return (
        joined.select(
            "r_name",
            "x",
            e.alias("residual"),
            h.alias("leverage"),
            cooks.alias("cooks_d"),
        )
        .orderBy(F.desc("cooks_d"), F.asc("r_name"), F.asc("x"))
        .limit(REG_INFLUENCE_TOP)
    )
q_regression_influence.__doc__ = q_regression_influence.__doc__ and q_regression_influence.__doc__.format(k=REG_INFLUENCE_TOP)


def _sql_reg_influence() -> str:
    return f"""
WITH monthly AS (
  SELECT r_name,
         CAST(YEAR(o_orderdate) * 12 + MONTH(o_orderdate) AS BIGINT) AS x,
         CAST(SUM(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS DOUBLE) / 1e9 AS v
  FROM orders
  JOIN customer ON o_custkey = c_custkey
  JOIN nation ON c_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey
  GROUP BY 1, 2
), mom AS (
  SELECT r_name,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(x) AS BIGINT) AS sx,
         {sql_fsum("v", _FS)} AS sy,
         {sql_fsum("v * CAST(x AS DOUBLE)", _FS)} AS sxy,
         CAST(SUM(x * x) AS BIGINT) AS sxx,
         {sql_fsum("v * v", _FS)} AS syy
  FROM monthly GROUP BY 1
), coef AS (
  SELECT r_name, n,
         (sxy - CAST(sx AS DOUBLE) * sy / CAST(n AS DOUBLE))
           / (CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) / CAST(n AS DOUBLE)) AS b,
         (sy - (sxy - CAST(sx AS DOUBLE) * sy / CAST(n AS DOUBLE))
               / (CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) / CAST(n AS DOUBLE))
               * CAST(sx AS DOUBLE)) / CAST(n AS DOUBLE) AS a,
         CAST(sx AS DOUBLE) / CAST(n AS DOUBLE) AS xbar,
         CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) / CAST(n AS DOUBLE) AS sxx_c,
         ((syy - sy * sy / CAST(n AS DOUBLE))
          - (sxy - CAST(sx AS DOUBLE) * sy / CAST(n AS DOUBLE))
            * (sxy - CAST(sx AS DOUBLE) * sy / CAST(n AS DOUBLE))
            / (CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) / CAST(n AS DOUBLE)))
           / (CAST(n AS DOUBLE) - 2.0) AS s2
  FROM mom
), diag AS (
  SELECT monthly.r_name, x,
         v - (a + b * CAST(x AS DOUBLE)) AS residual,
         1.0 / CAST(n AS DOUBLE)
           + (CAST(x AS DOUBLE) - xbar) * (CAST(x AS DOUBLE) - xbar) / sxx_c AS leverage
  FROM monthly JOIN coef USING (r_name)
), cooks AS (
  SELECT diag.r_name, x, residual, leverage,
         (residual * residual * leverage)
           / (2.0 * s2 * (1.0 - leverage) * (1.0 - leverage)) AS cooks_d
  FROM diag JOIN coef ON diag.r_name = coef.r_name
)
SELECT r_name, x, residual, leverage, cooks_d
FROM cooks
ORDER BY cooks_d DESC, r_name ASC, x ASC
LIMIT {REG_INFLUENCE_TOP}
"""


# ---------------------------------------------------------------------------
# Round-10 additions: rank/effect-size/distribution-distance/inequality
# ---------------------------------------------------------------------------


def q_wilcoxon_signed_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wilcoxon signed-rank test on PAIRED per-customer revenue: cents
    before {s} vs on/after it — the magnitude-aware companion of
    ``mcnemar_paired`` (same pairing, but ranks |difference| instead of
    discretizing to a binary). Midranks are carried DOUBLED so ties stay
    integer: r2 = 2·(#pairs with smaller |d|) + t + 1 where t is the tie
    count at |d|; W+ doubled = Σ_(d>0) count·r2. The normal approximation
    uses the EXACT tie-corrected variance: Var[2W+] = (2n(n+1)(2n+1) −
    Σ(t³−t))/12 — both the numerator moments and the tie-cube sum are
    DECIMAL(38,0) integer aggregates (no int64 wraparound at 2e9+ pairs,
    the roc_auc_exact discipline), and z is one IEEE sequence on them.

    Scale shape: one per-customer hash agg (data-sized), one per-|d| hash
    agg, then the ``global_rank_bucketed`` decomposition for the
    cumulative smaller-count (1024 range buckets → broadcast prefix
    offsets → within-bucket running sums) instead of a single-task global
    window; the oracle's plain window proves the decomposition
    value-identical."""
    orders = load_table(spark, sf_dir, "orders")
    pre = F.col("o_orderdate") < F.lit(_MCN_SPLIT).cast("timestamp")
    cents = F.round(F.col("o_totalprice") * 100, 0).cast("bigint")
    per_cust = orders.groupBy("o_custkey").agg(
        F.sum(F.when(pre, cents).otherwise(F.lit(0))).cast("long").alias("c_pre"),
        F.sum(F.when(~pre, cents).otherwise(F.lit(0))).cast("long").alias("c_post"),
    )
    diffs = per_cust.select(
        (F.col("c_post") - F.col("c_pre")).alias("d")
    ).filter(F.col("d") != 0)
    byv = diffs.groupBy(F.abs(F.col("d")).alias("absd")).agg(
        F.count(F.lit(1)).cast("long").alias("cnt"),
        F.sum(F.when(F.col("d") > 0, 1).otherwise(0)).cast("long").alias("pos"),
    )
    stats = byv.agg(F.min("absd").alias("_mn"), F.max("absd").alias("_mx"))
    based = byv.crossJoin(F.broadcast(stats))
    b = F.coalesce(
        F.least(
            F.lit(1023),
            F.expr("((absd - _mn) * 1024) div (_mx - _mn + 1)"),
        ).cast("int"),
        F.lit(0),
    )
    bucketed = based.withColumn("_b", b)
    offsets = (
        bucketed.groupBy("_b")
        .agg(F.sum("cnt").cast("long").alias("_bn"))
        .withColumn(
            "_off",
            F.coalesce(
                F.sum("_bn").over(
                    Window.orderBy("_b").rowsBetween(Window.unboundedPreceding, -1)
                ),
                F.lit(0),
            ).cast("long"),
        )
        .select("_b", "_off")
    )
    w_in = Window.partitionBy("_b").orderBy("absd").rowsBetween(
        Window.unboundedPreceding, -1
    )
    ranked = bucketed.join(F.broadcast(offsets), "_b").withColumn(
        "cnt_less",
        F.col("_off") + F.coalesce(F.sum("cnt").over(w_in), F.lit(0)),
    )
    r2 = F.lit(2) * F.col("cnt_less") + F.col("cnt") + F.lit(1)
    agg = ranked.agg(
        F.sum("cnt").cast("long").alias("n_pairs"),
        F.sum((F.col("pos") * r2).cast("decimal(38,0)"))
        .cast("decimal(38,0)")
        .alias("w2p"),
        F.sum(
            (
                F.col("cnt").cast("decimal(12,0)")
                * F.col("cnt").cast("decimal(12,0)")
                * F.col("cnt").cast("decimal(12,0)")
                - F.col("cnt")
            ).cast("decimal(38,0)")
        )
        .cast("decimal(38,0)")
        .alias("tie3"),
    )
    nd = F.col("n_pairs").cast("double")
    mean2 = nd * (nd + 1.0) / F.lit(2.0)
    var12 = (
        F.lit(2.0) * nd * (nd + 1.0) * (F.lit(2.0) * nd + 1.0)
        - F.col("tie3").cast("double")
    )
    return agg.select(
        "n_pairs",
        F.col("w2p").cast("double").alias("w2_plus"),
        ((F.col("w2p").cast("double") - mean2) / F.sqrt(var12 / F.lit(12.0))).alias(
            "z_stat"
        ),
    )
q_wilcoxon_signed_rank.__doc__ = q_wilcoxon_signed_rank.__doc__ and q_wilcoxon_signed_rank.__doc__.format(s=_MCN_SPLIT)


_ORACLE_WILCOXON = f"""
WITH per_cust AS (
  SELECT o_custkey,
         CAST(SUM(CASE WHEN o_orderdate < TIMESTAMP '{_MCN_SPLIT}'
                       THEN CAST(round(o_totalprice * 100, 0) AS BIGINT)
                       ELSE 0 END) AS BIGINT) AS c_pre,
         CAST(SUM(CASE WHEN NOT (o_orderdate < TIMESTAMP '{_MCN_SPLIT}')
                       THEN CAST(round(o_totalprice * 100, 0) AS BIGINT)
                       ELSE 0 END) AS BIGINT) AS c_post
  FROM orders GROUP BY 1
), diffs AS (
  SELECT c_post - c_pre AS d FROM per_cust WHERE c_post - c_pre <> 0
), byv AS (
  SELECT abs(d) AS absd,
         CAST(COUNT(*) AS BIGINT) AS cnt,
         CAST(SUM(CASE WHEN d > 0 THEN 1 ELSE 0 END) AS BIGINT) AS pos
  FROM diffs GROUP BY 1
), ranked AS (
  SELECT absd, cnt, pos,
         CAST(COALESCE(SUM(cnt) OVER (ORDER BY absd
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
           AS cnt_less
  FROM byv
), agg AS (
  SELECT CAST(SUM(cnt) AS BIGINT) AS n_pairs,
         CAST(SUM(CAST(pos AS HUGEINT) * (2 * cnt_less + cnt + 1))
              AS DECIMAL(38,0)) AS w2p,
         CAST(SUM(CAST(cnt AS HUGEINT) * cnt * cnt - cnt)
              AS DECIMAL(38,0)) AS tie3
  FROM ranked
)
SELECT n_pairs,
       CAST(w2p AS DOUBLE) AS w2_plus,
       (CAST(w2p AS DOUBLE)
        - CAST(n_pairs AS DOUBLE) * (CAST(n_pairs AS DOUBLE) + 1.0) / 2.0)
       / sqrt((2.0 * CAST(n_pairs AS DOUBLE) * (CAST(n_pairs AS DOUBLE) + 1.0)
               * (2.0 * CAST(n_pairs AS DOUBLE) + 1.0)
               - CAST(tie3 AS DOUBLE)) / 12.0) AS z_stat
FROM agg
"""


def q_energy_distance_two_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Energy-distance two-sample statistic on order value (urgent vs the
    rest): D² = 2·E|X−Y| − E|X−X'| − E|Y−Y'| — the INTEGRAL-metric
    companion of ``ks_two_sample`` (KS reads one sup-norm point; energy
    distance integrates the whole ECDF gap, so it sees tail shifts KS
    underweights). Each pairwise-distance expectation is computed WITHOUT
    an O(n²) pair join, via the sorted-prefix identity Σ_j |v − y_j| =
    v·(2·a(v) − n) − 2·S(v) + T over the per-value grouped table, where
    a/S are cumulative count/sum of values ≤ v. All three pair sums are
    exact integer (cent) aggregates carried as DECIMAL(38,0); the three
    divisions and final combination are one IEEE sequence.

    Scale shape: one per-value hash agg, then the bucketed global-rank
    decomposition (1024 value-range buckets, broadcast prefix offsets of
    FOUR running quantities: both counts and both cent sums) — no
    single-task window, no pair explosion. The oracle's plain windows
    prove the decomposition value-identical."""
    orders = load_table(spark, sf_dir, "orders").select(
        F.round(F.col("o_totalprice") * 100, 0).cast("bigint").alias("v"),
        F.when(F.col("o_orderpriority") == "1-URGENT", F.lit(1))
        .otherwise(F.lit(0))
        .alias("g1"),
    )
    byv = orders.groupBy("v").agg(
        F.sum("g1").cast("long").alias("c1"),
        F.sum(F.lit(1) - F.col("g1")).cast("long").alias("c2"),
    )
    stats = byv.agg(F.min("v").alias("_mn"), F.max("v").alias("_mx"))
    based = byv.crossJoin(F.broadcast(stats))
    b = F.coalesce(
        F.least(
            F.lit(1023), F.expr("((v - _mn) * 1024) div (_mx - _mn + 1)")
        ).cast("int"),
        F.lit(0),
    )
    bucketed = based.withColumn("_b", b)
    offsets = (
        bucketed.groupBy("_b")
        .agg(
            F.sum("c1").cast("long").alias("_b1"),
            F.sum("c2").cast("long").alias("_b2"),
            F.sum(F.col("v") * F.col("c1")).cast("decimal(38,0)").alias("_bs1"),
            F.sum(F.col("v") * F.col("c2")).cast("decimal(38,0)").alias("_bs2"),
        )
        .select(
            "_b",
            *[
                F.coalesce(
                    F.sum(c).over(
                        Window.orderBy("_b").rowsBetween(
                            Window.unboundedPreceding, -1
                        )
                    ),
                    F.lit(0).cast("decimal(38,0)") if c.startswith("_bs") else F.lit(0),
                ).alias("_off" + c[2:])
                for c in ["_b1", "_b2", "_bs1", "_bs2"]
            ],
        )
    )
    w_in = Window.partitionBy("_b").orderBy("v").rowsBetween(
        Window.unboundedPreceding, 0
    )
    cum = bucketed.join(F.broadcast(offsets), "_b").select(
        "v",
        "c1",
        "c2",
        (F.col("_off1") + F.sum("c1").over(w_in)).cast("long").alias("a1"),
        (F.col("_off2") + F.sum("c2").over(w_in)).cast("long").alias("a2"),
        (F.col("_offs1").cast("decimal(38,0)")
         + F.sum((F.col("v") * F.col("c1")).cast("decimal(38,0)")).over(w_in))
        .alias("s1"),
        (F.col("_offs2").cast("decimal(38,0)")
         + F.sum((F.col("v") * F.col("c2")).cast("decimal(38,0)")).over(w_in))
        .alias("s2"),
    )
    tot = byv.agg(
        F.sum("c1").cast("long").alias("n1"),
        F.sum("c2").cast("long").alias("n2"),
        F.sum(F.col("v") * F.col("c1")).cast("decimal(38,0)").alias("t1"),
        F.sum(F.col("v") * F.col("c2")).cast("decimal(38,0)").alias("t2"),
    )
    vd = F.col("v").cast("decimal(38,0)")
    joined = cum.crossJoin(F.broadcast(tot))
    sums = joined.agg(
        F.sum(
            (
                F.col("c1").cast("decimal(38,0)")
                * (
                    vd * (F.lit(2) * F.col("a2") - F.col("n2")).cast("decimal(38,0)")
                    - F.lit(2) * F.col("s2")
                    + F.col("t2")
                )
            ).cast("decimal(38,0)")
        ).cast("decimal(38,0)").alias("sxy"),
        F.sum(
            (
                F.col("c1").cast("decimal(38,0)")
                * (
                    vd * (F.lit(2) * F.col("a1") - F.col("n1")).cast("decimal(38,0)")
                    - F.lit(2) * F.col("s1")
                    + F.col("t1")
                )
            ).cast("decimal(38,0)")
        ).cast("decimal(38,0)").alias("sxx"),
        F.sum(
            (
                F.col("c2").cast("decimal(38,0)")
                * (
                    vd * (F.lit(2) * F.col("a2") - F.col("n2")).cast("decimal(38,0)")
                    - F.lit(2) * F.col("s2")
                    + F.col("t2")
                )
            ).cast("decimal(38,0)")
        ).cast("decimal(38,0)").alias("syy"),
        F.max("n1").alias("n1"),
        F.max("n2").alias("n2"),
    )
    n1d = F.col("n1").cast("double")
    n2d = F.col("n2").cast("double")
    e_xy = F.col("sxy").cast("double") / (n1d * n2d)
    e_xx = F.col("sxx").cast("double") / (n1d * n1d)
    e_yy = F.col("syy").cast("double") / (n2d * n2d)
    return sums.select(
        "n1",
        "n2",
        (e_xy / F.lit(100.0)).alias("mean_absdiff_xy"),
        ((F.lit(2.0) * e_xy - e_xx - e_yy) / F.lit(100.0)).alias("energy_dist_sq"),
    )


_ORACLE_ENERGY = """
WITH vals AS (
  SELECT CAST(round(o_totalprice * 100, 0) AS BIGINT) AS v,
         CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END AS g1
  FROM orders
), byv AS (
  SELECT v, CAST(SUM(g1) AS BIGINT) AS c1,
         CAST(SUM(1 - g1) AS BIGINT) AS c2
  FROM vals GROUP BY 1
), cum AS (
  SELECT v, c1, c2,
         CAST(SUM(c1) OVER w AS BIGINT) AS a1,
         CAST(SUM(c2) OVER w AS BIGINT) AS a2,
         CAST(SUM(CAST(v AS HUGEINT) * c1) OVER w AS DECIMAL(38,0)) AS s1,
         CAST(SUM(CAST(v AS HUGEINT) * c2) OVER w AS DECIMAL(38,0)) AS s2
  FROM byv
  WINDOW w AS (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
), tot AS (
  SELECT CAST(SUM(c1) AS BIGINT) AS n1, CAST(SUM(c2) AS BIGINT) AS n2,
         CAST(SUM(CAST(v AS HUGEINT) * c1) AS DECIMAL(38,0)) AS t1,
         CAST(SUM(CAST(v AS HUGEINT) * c2) AS DECIMAL(38,0)) AS t2
  FROM byv
), sums AS (
  SELECT
    CAST(SUM(CAST(c1 AS HUGEINT) * (CAST(v AS HUGEINT) * (2 * a2 - n2)
         - 2 * CAST(s2 AS HUGEINT) + CAST(t2 AS HUGEINT))) AS DECIMAL(38,0)) AS sxy,
    CAST(SUM(CAST(c1 AS HUGEINT) * (CAST(v AS HUGEINT) * (2 * a1 - n1)
         - 2 * CAST(s1 AS HUGEINT) + CAST(t1 AS HUGEINT))) AS DECIMAL(38,0)) AS sxx,
    CAST(SUM(CAST(c2 AS HUGEINT) * (CAST(v AS HUGEINT) * (2 * a2 - n2)
         - 2 * CAST(s2 AS HUGEINT) + CAST(t2 AS HUGEINT))) AS DECIMAL(38,0)) AS syy,
    MAX(n1) AS n1, MAX(n2) AS n2
  FROM cum CROSS JOIN tot
)
SELECT n1, n2,
       (CAST(sxy AS DOUBLE) / (CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE))) / 100.0
         AS mean_absdiff_xy,
       ((2.0 * CAST(sxy AS DOUBLE) / (CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)))
        - (CAST(sxx AS DOUBLE) / (CAST(n1 AS DOUBLE) * CAST(n1 AS DOUBLE)))
        - (CAST(syy AS DOUBLE) / (CAST(n2 AS DOUBLE) * CAST(n2 AS DOUBLE)))) / 100.0
         AS energy_dist_sq
FROM sums
"""


def q_cohens_d_effect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohen's d and Hedges' g effect size for urgent vs non-urgent order
    value — the magnitude companion of ``welch_ttest``'s significance
    (statistics.py): a p-value says the difference exists; d says whether
    anyone should care. Pooled SD from EXACT integer cent moments (n, Σx,
    Σx² per group, x in $10M units per the module's unit discipline
    applied BEFORE squaring); d and the small-sample correction J = 1 −
    3/(4·df − 1) are one IEEE sequence.

    Scale shape: one map-side-combinable hash agg of six sums over the
    scan — nothing else."""
    orders = load_table(spark, sf_dir, "orders")
    g1 = F.when(F.col("o_orderpriority") == "1-URGENT", F.lit(1)).otherwise(F.lit(0))
    x = F.round(F.col("o_totalprice") * 100, 0).cast("bigint").cast("double") / F.lit(
        _UNIT
    )
    agg = orders.agg(
        F.sum(g1).cast("long").alias("n1"),
        F.sum(F.lit(1) - g1).cast("long").alias("n2"),
        fsum(F.when(g1 == 1, x).otherwise(F.lit(0.0)), scale=12).alias("sx1"),
        fsum(F.when(g1 == 0, x).otherwise(F.lit(0.0)), scale=12).alias("sx2"),
        fsum(F.when(g1 == 1, x * x).otherwise(F.lit(0.0)), scale=14).alias("sq1"),
        fsum(F.when(g1 == 0, x * x).otherwise(F.lit(0.0)), scale=14).alias("sq2"),
    )
    n1d = F.col("n1").cast("double")
    n2d = F.col("n2").cast("double")
    m1 = F.col("sx1") / n1d
    m2 = F.col("sx2") / n2d
    ss1 = F.col("sq1") - F.col("sx1") * F.col("sx1") / n1d
    ss2 = F.col("sq2") - F.col("sx2") * F.col("sx2") / n2d
    df = n1d + n2d - F.lit(2.0)
    sp = F.sqrt((ss1 + ss2) / df)
    d = (m1 - m2) / sp
    j = F.lit(1.0) - F.lit(3.0) / (F.lit(4.0) * df - F.lit(1.0))
    return agg.select(
        "n1",
        "n2",
        ((m1 - m2) * F.lit(_UNIT / 100.0)).alias("mean_diff_dollars"),
        d.alias("cohens_d"),
        (d * j).alias("hedges_g"),
    )


_ORACLE_COHENS_D = f"""
WITH agg AS (
  SELECT
    CAST(SUM(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END) AS BIGINT) AS n1,
    CAST(SUM(CASE WHEN o_orderpriority = '1-URGENT' THEN 0 ELSE 1 END) AS BIGINT) AS n2,
    {sql_fsum("CASE WHEN o_orderpriority = '1-URGENT' THEN CAST(CAST(round(o_totalprice * 100, 0) AS BIGINT) AS DOUBLE) / 1000000000.0 ELSE 0.0 END", scale=12)} AS sx1,
    {sql_fsum("CASE WHEN o_orderpriority = '1-URGENT' THEN 0.0 ELSE CAST(CAST(round(o_totalprice * 100, 0) AS BIGINT) AS DOUBLE) / 1000000000.0 END", scale=12)} AS sx2,
    {sql_fsum("CASE WHEN o_orderpriority = '1-URGENT' THEN (CAST(CAST(round(o_totalprice * 100, 0) AS BIGINT) AS DOUBLE) / 1000000000.0) * (CAST(CAST(round(o_totalprice * 100, 0) AS BIGINT) AS DOUBLE) / 1000000000.0) ELSE 0.0 END", scale=14)} AS sq1,
    {sql_fsum("CASE WHEN o_orderpriority = '1-URGENT' THEN 0.0 ELSE (CAST(CAST(round(o_totalprice * 100, 0) AS BIGINT) AS DOUBLE) / 1000000000.0) * (CAST(CAST(round(o_totalprice * 100, 0) AS BIGINT) AS DOUBLE) / 1000000000.0) END", scale=14)} AS sq2
  FROM orders
)
SELECT n1, n2,
       ((sx1 / CAST(n1 AS DOUBLE)) - (sx2 / CAST(n2 AS DOUBLE))) * 10000000.0
         AS mean_diff_dollars,
       ((sx1 / CAST(n1 AS DOUBLE)) - (sx2 / CAST(n2 AS DOUBLE)))
         / sqrt(((sq1 - sx1 * sx1 / CAST(n1 AS DOUBLE))
                 + (sq2 - sx2 * sx2 / CAST(n2 AS DOUBLE)))
                / (CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE) - 2.0)) AS cohens_d,
       (((sx1 / CAST(n1 AS DOUBLE)) - (sx2 / CAST(n2 AS DOUBLE)))
         / sqrt(((sq1 - sx1 * sx1 / CAST(n1 AS DOUBLE))
                 + (sq2 - sx2 * sx2 / CAST(n2 AS DOUBLE)))
                / (CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE) - 2.0)))
       * (1.0 - 3.0 / (4.0 * (CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE) - 2.0) - 1.0))
         AS hedges_g
FROM agg
"""


def q_atkinson_inequality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Atkinson inequality index A(ε=2) of per-customer revenue: A(2) =
    1 − (harmonic mean)/(arithmetic mean) — the welfare-weighted
    inequality companion of ``gini_revenue`` (statistics.py). ε=2 is the
    one Atkinson parameter whose equally-distributed-equivalent income is
    fully RATIONAL (the harmonic mean), so the whole index stays inside
    the no-transcendentals gate contract (ε=1 would need a geometric
    mean, i.e. exp/ln). Revenue totals are exact cents; the reciprocal
    sum Σ1/x is a floor-quantized deterministic sum (fsum) of reciprocals
    taken in $10M units (x_u = cents/1e9, so addends sit near 1 and the
    1e-10 quantum is ~10 digits below them — reciprocals of raw cents
    would be ~5e-9 and the quantum would eat 7 significant digits,
    measured while testing).

    Scale shape: one per-customer hash agg, then one global 3-sum agg —
    both map-side combinable; nothing domain-sized shuffles twice."""
    orders = load_table(spark, sf_dir, "orders")
    cents = F.round(F.col("o_totalprice") * 100, 0).cast("bigint")
    per_cust = orders.groupBy("o_custkey").agg(
        F.sum(cents).cast("long").alias("rev")
    )
    agg = per_cust.filter(F.col("rev") > 0).agg(
        F.count(F.lit(1)).cast("long").alias("n_customers"),
        F.sum("rev").cast("decimal(38,0)").alias("tot_cents"),
        fsum(
            F.lit(1.0) / (F.col("rev").cast("double") / F.lit(_UNIT)), scale=10
        ).alias("sinv_u"),
    )
    nd = F.col("n_customers").cast("double")
    mean_c = F.col("tot_cents").cast("double") / nd
    harm_c = nd / F.col("sinv_u") * F.lit(_UNIT)
    return agg.select(
        "n_customers",
        (mean_c / F.lit(100.0)).alias("mean_revenue_dollars"),
        (harm_c / F.lit(100.0)).alias("harmonic_mean_dollars"),
        (F.lit(1.0) - harm_c / mean_c).alias("atkinson_2"),
    )


_ORACLE_ATKINSON = f"""
WITH per_cust AS (
  SELECT o_custkey,
         CAST(SUM(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT) AS rev
  FROM orders GROUP BY 1
), agg AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_customers,
         CAST(SUM(rev) AS DECIMAL(38,0)) AS tot_cents,
         {sql_fsum("1.0 / (CAST(rev AS DOUBLE) / 1000000000.0)", scale=10)} AS sinv_u
  FROM per_cust WHERE rev > 0
)
SELECT n_customers,
       (CAST(tot_cents AS DOUBLE) / CAST(n_customers AS DOUBLE)) / 100.0
         AS mean_revenue_dollars,
       (CAST(n_customers AS DOUBLE) / sinv_u * 1000000000.0) / 100.0
         AS harmonic_mean_dollars,
       1.0 - (CAST(n_customers AS DOUBLE) / sinv_u * 1000000000.0)
             / (CAST(tot_cents AS DOUBLE) / CAST(n_customers AS DOUBLE))
         AS atkinson_2
FROM agg
"""


CONF_ALPHA_NUM = 1  # miscoverage alpha = 1/10 -> 90% intervals
CONF_ALPHA_DEN = 10


def q_conformal_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Split-conformal prediction intervals per order priority: fit the
    trivial per-priority mean model on the CALIBRATION half (even order
    keys), take q̂ = the ⌈(n+1)(1−α)⌉-th smallest absolute residual, and
    report the EMPIRICAL COVERAGE of mean ± q̂ on the held-out validation
    half — the distribution-free guarantee (coverage ≥ 1−α for
    exchangeable data, Vovk/Lei–Wasserman) that modern ML eval ships
    instead of Gaussian error bars. α = {an}/{ad}. The quantile index is
    computed in INTEGERS (⌈(n+1)·9/10⌉ = ((n+1)·9 + 9) div 10 — no float
    boundary); residuals are exact cents minus a deterministic mean (one
    IEEE subtraction each); coverage is an exact integer ratio.

    Scale shape: one calibration hash agg (means), one keyed residual
    window per priority for the order statistic (the quantile partition
    is the 5-value priority domain with data-sized partitions — at 100 TB
    swap in the ``global_rank_bucketed`` decomposition per priority, same
    value), one validation agg. The split is a deterministic key-parity
    predicate, so both engines pick identical halves."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_orderpriority",
        F.round(F.col("o_totalprice") * 100, 0).cast("bigint").alias("cents"),
    )
    cal = orders.filter(F.col("o_orderkey") % 2 == 0)
    val = orders.filter(F.col("o_orderkey") % 2 != 0)
    model = cal.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).cast("long").alias("n_cal"),
        (F.sum("cents").cast("double") / F.count(F.lit(1)).cast("double")).alias(
            "mu"
        ),
    )
    resid = cal.join(F.broadcast(model), "o_orderpriority").select(
        "o_orderpriority",
        "n_cal",
        F.abs(F.col("cents").cast("double") - F.col("mu")).alias("r"),
    )
    w = Window.partitionBy("o_orderpriority").orderBy("r")
    qhat = (
        resid.withColumn("rn", F.row_number().over(w))
        .filter(
            F.col("rn")
            == F.expr(
                f"((n_cal + 1) * {CONF_ALPHA_DEN - CONF_ALPHA_NUM}"
                f" + {CONF_ALPHA_DEN - 1}) div {CONF_ALPHA_DEN}"
            )
        )
        .select("o_orderpriority", F.col("r").alias("qhat"))
    )
    scored = val.join(F.broadcast(model), "o_orderpriority").join(
        F.broadcast(qhat), "o_orderpriority"
    )
    return (
        scored.groupBy("o_orderpriority")
        .agg(
            F.max("n_cal").alias("n_cal"),
            F.count(F.lit(1)).cast("long").alias("n_val"),
            F.max(F.col("qhat") / F.lit(100.0)).alias("qhat_dollars"),
            F.sum(
                F.when(
                    F.abs(F.col("cents").cast("double") - F.col("mu"))
                    <= F.col("qhat"),
                    1,
                ).otherwise(0)
            )
            .cast("long")
            .alias("n_covered"),
        )
        .select(
            "o_orderpriority",
            "n_cal",
            "n_val",
            "qhat_dollars",
            (F.col("n_covered").cast("double") / F.col("n_val").cast("double")).alias(
                "coverage"
            ),
        )
        .orderBy("o_orderpriority")
    )
q_conformal_interval.__doc__ = q_conformal_interval.__doc__ and q_conformal_interval.__doc__.format(
        an=CONF_ALPHA_NUM, ad=CONF_ALPHA_DEN
    )


_ORACLE_CONFORMAL = f"""
WITH orders2 AS (
  SELECT o_orderkey, o_orderpriority,
         CAST(round(o_totalprice * 100, 0) AS BIGINT) AS cents
  FROM orders
), cal AS (SELECT * FROM orders2 WHERE o_orderkey % 2 = 0),
val AS (SELECT * FROM orders2 WHERE o_orderkey % 2 <> 0),
model AS (
  SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n_cal,
         CAST(SUM(cents) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS mu
  FROM cal GROUP BY 1
), resid AS (
  SELECT c.o_orderpriority, m.n_cal,
         ABS(CAST(c.cents AS DOUBLE) - m.mu) AS r
  FROM cal c JOIN model m USING (o_orderpriority)
), qhat AS (
  SELECT o_orderpriority, r AS qhat FROM (
    SELECT o_orderpriority, n_cal, r,
           ROW_NUMBER() OVER (PARTITION BY o_orderpriority ORDER BY r) AS rn
    FROM resid
  ) WHERE rn = ((n_cal + 1) * {CONF_ALPHA_DEN - CONF_ALPHA_NUM}
                + {CONF_ALPHA_DEN - 1}) // {CONF_ALPHA_DEN}
)
SELECT v.o_orderpriority,
       MAX(m.n_cal) AS n_cal,
       CAST(COUNT(*) AS BIGINT) AS n_val,
       MAX(q.qhat / 100.0) AS qhat_dollars,
       CAST(SUM(CASE WHEN ABS(CAST(v.cents AS DOUBLE) - m.mu) <= q.qhat
                     THEN 1 ELSE 0 END) AS DOUBLE)
         / CAST(COUNT(*) AS DOUBLE) AS coverage
FROM val v JOIN model m USING (o_orderpriority) JOIN qhat q USING (o_orderpriority)
GROUP BY 1
ORDER BY o_orderpriority
"""


_ITS_T0 = 1998 * 12 + 1  # intervention month: 1998-01


def q_interrupted_time_series(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interrupted time-series (segmented regression) effect estimates
    per region at {d}: where ``chow_test`` (same frame, this module)
    only answers "did the trend change" with an F statistic, ITS reports
    the EFFECT — the level change (post-intercept minus pre-intercept at
    the intervention month) and the slope change — the standard
    quasi-experimental readout when randomization is impossible (policy
    changes, price changes, incidents). Months are centered on the
    intervention (u = ym − t0) so both intercepts are directly
    comparable at u = 0. Both segment fits come from ONE conditional-
    moment hash agg (the chow_test recipe): x is the exact integer u,
    y is revenue in $10M units with floor-quantized moments; slopes,
    intercepts, and the two effects are one IEEE sequence on 5 rows.

    Scale shape: scan → |region|×|month| cells; everything after is
    5-row arithmetic."""
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    monthly = (
        orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy(
            "r_name",
            (
                F.year("o_orderdate") * 12 + F.month("o_orderdate") - F.lit(_ITS_T0)
            ).alias("u"),
        )
        .agg(
            F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("bigint"))
            .cast("long")
            .alias("cents")
        )
        .select(
            "r_name",
            F.col("u").cast("long").alias("u"),
            (F.col("cents").cast("double") / F.lit(_UNIT)).alias("y"),
        )
    )
    pre = F.col("u") < 0

    def seg(tag, cond):
        return [
            F.sum(F.when(cond, 1).otherwise(0)).cast("long").alias(f"n{tag}"),
            F.sum(F.when(cond, F.col("u")).otherwise(F.lit(0)))
            .cast("long")
            .alias(f"sx{tag}"),
            F.sum(F.when(cond, F.col("u") * F.col("u")).otherwise(F.lit(0)))
            .cast("long")
            .alias(f"sxx{tag}"),
            fsum(F.when(cond, F.col("y")).otherwise(F.lit(0.0)), scale=_FS).alias(
                f"sy{tag}"
            ),
            fsum(
                F.when(cond, F.col("u").cast("double") * F.col("y")).otherwise(
                    F.lit(0.0)
                ),
                scale=_FS,
            ).alias(f"sxy{tag}"),
        ]

    m = monthly.groupBy("r_name").agg(*seg("1", pre), *seg("2", ~pre))

    def fit(tag):
        n = F.col(f"n{tag}").cast("double")
        sx = F.col(f"sx{tag}").cast("double")
        sxx = F.col(f"sxx{tag}").cast("double")
        sy = F.col(f"sy{tag}")
        sxy = F.col(f"sxy{tag}")
        b = (n * sxy - sx * sy) / (n * sxx - sx * sx)
        a = (sy - b * sx) / n
        return a, b

    a1, b1 = fit("1")
    a2, b2 = fit("2")
    return m.select(
        "r_name",
        F.col("n1").alias("n_pre"),
        F.col("n2").alias("n_post"),
        (b1 * F.lit(10.0)).alias("slope_pre_musd"),
        (b2 * F.lit(10.0)).alias("slope_post_musd"),
        ((b2 - b1) * F.lit(10.0)).alias("slope_change_musd"),
        ((a2 - a1) * F.lit(10.0)).alias("level_change_musd"),
    ).orderBy("r_name")
q_interrupted_time_series.__doc__ = q_interrupted_time_series.__doc__ and q_interrupted_time_series.__doc__.format(d="1998-01")


def _sql_its() -> str:
    def seg(tag, cond):
        return f"""
         CAST(SUM(CASE WHEN {cond} THEN 1 ELSE 0 END) AS BIGINT) AS n{tag},
         CAST(SUM(CASE WHEN {cond} THEN u ELSE 0 END) AS BIGINT) AS sx{tag},
         CAST(SUM(CASE WHEN {cond} THEN u * u ELSE 0 END) AS BIGINT) AS sxx{tag},
         {sql_fsum(f"CASE WHEN {cond} THEN y ELSE 0.0 END", scale=8)} AS sy{tag},
         {sql_fsum(f"CASE WHEN {cond} THEN CAST(u AS DOUBLE) * y ELSE 0.0 END", scale=8)} AS sxy{tag}"""

    def fit(tag):
        n = f"CAST(n{tag} AS DOUBLE)"
        sx = f"CAST(sx{tag} AS DOUBLE)"
        sxx = f"CAST(sxx{tag} AS DOUBLE)"
        b = f"(({n} * sxy{tag} - {sx} * sy{tag}) / ({n} * {sxx} - {sx} * {sx}))"
        a = f"((sy{tag} - {b} * {sx}) / {n})"
        return a, b

    a1, b1 = fit("1")
    a2, b2 = fit("2")
    return f"""
WITH monthly AS (
  SELECT r_name,
         CAST(YEAR(o_orderdate) * 12 + MONTH(o_orderdate) - {_ITS_T0} AS BIGINT) AS u,
         CAST(CAST(SUM(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT)
              AS DOUBLE) / 1000000000.0 AS y
  FROM orders
  JOIN customer ON o_custkey = c_custkey
  JOIN nation ON c_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey
  GROUP BY 1, 2
), m AS (
  SELECT r_name, {seg("1", "u < 0")}, {seg("2", "u >= 0")}
  FROM monthly GROUP BY 1
)
SELECT r_name, n1 AS n_pre, n2 AS n_post,
       {b1} * 10.0 AS slope_pre_musd,
       {b2} * 10.0 AS slope_post_musd,
       ({b2} - {b1}) * 10.0 AS slope_change_musd,
       ({a2} - {a1}) * 10.0 AS level_change_musd
FROM m
ORDER BY r_name
"""


def q_pacf_closed_form(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partial autocorrelation of the daily-revenue series at lags 1–3
    via the CLOSED-FORM Durbin–Levinson solutions — the Box–Jenkins
    order-identification companion of ``acf_lags`` (ACF tails off for AR
    processes; PACF cuts off at the AR order, and it's the cut-off you
    read to pick p): φ₁₁ = ρ₁, φ₂₂ = (ρ₂−ρ₁²)/(1−ρ₁²), φ₃₃ = the 3×3
    Toeplitz Cramer ratio — three FIXED rational expressions on the same
    exact-moment ρ values the ACF entry ships, written identically in
    both engines (no iterative solver, no matrix library).

    Scale shape: identical to acf_lags — one data-sized hash agg, then
    the ~2.4k-row domain-sized lag frame; the PACF algebra runs on one
    row."""
    acf = _acf_frame(spark, sf_dir).filter(F.col("lag") <= 3)
    piv = acf.agg(
        F.max("n").alias("n"),
        F.max(F.when(F.col("lag") == 1, F.col("acf"))).alias("r1"),
        F.max(F.when(F.col("lag") == 2, F.col("acf"))).alias("r2"),
        F.max(F.when(F.col("lag") == 3, F.col("acf"))).alias("r3"),
    )
    r1, r2, r3 = F.col("r1"), F.col("r2"), F.col("r3")
    phi22 = (r2 - r1 * r1) / (F.lit(1.0) - r1 * r1)
    phi33_num = r3 - F.lit(2.0) * r1 * r2 - r1 * r1 * r3 + r1 * r2 * r2 + r1 * r1 * r1
    phi33_den = F.lit(1.0) - F.lit(2.0) * r1 * r1 + F.lit(2.0) * r1 * r1 * r2 - r2 * r2
    return piv.select(
        "n",
        r1.alias("acf1"),
        r2.alias("acf2"),
        r3.alias("acf3"),
        r1.alias("pacf1"),
        phi22.alias("pacf2"),
        (phi33_num / phi33_den).alias("pacf3"),
    )


_ORACLE_PACF = f"""
WITH acf AS ({_SQL_ACF_FRAME}), piv AS (
  SELECT MAX(n) AS n,
         MAX(CASE WHEN lag = 1 THEN acf END) AS r1,
         MAX(CASE WHEN lag = 2 THEN acf END) AS r2,
         MAX(CASE WHEN lag = 3 THEN acf END) AS r3
  FROM acf WHERE lag <= 3
)
SELECT n, r1 AS acf1, r2 AS acf2, r3 AS acf3,
       r1 AS pacf1,
       (r2 - r1 * r1) / (1.0 - r1 * r1) AS pacf2,
       (r3 - 2.0 * r1 * r2 - r1 * r1 * r3 + r1 * r2 * r2 + r1 * r1 * r1)
         / (1.0 - 2.0 * r1 * r1 + 2.0 * r1 * r1 * r2 - r2 * r2) AS pacf3
FROM piv
"""


def q_mmd_poly_two_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximum Mean Discrepancy between urgent and non-urgent order
    values under the degree-2 polynomial kernel k(x,y) = (xy+1)² — the
    KERNEL two-sample test beside ``energy_distance_two_sample``
    (energy = a fixed distance kernel read via prefix sums; polynomial
    MMD = a kernel whose pair sums COLLAPSE INTO MOMENTS:
    Σᵢⱼ(xᵢyⱼ+1)² = (Σx²)(Σy²) + 2(Σx)(Σy) + n·m, so the entire U-statistic
    is O(n) exact arithmetic, no pair structure at all). The UNBIASED
    estimator excludes i=j via the Σx⁴-corrected diagonal. Values in $10M
    units; all six moments floor-quantized (fsum); MMD² is one IEEE
    sequence.

    Scale shape: ONE map-side-combinable 8-sum hash agg over the scan —
    the cheapest two-sample machinery in the registry."""
    orders = load_table(spark, sf_dir, "orders")
    g1 = F.when(F.col("o_orderpriority") == "1-URGENT", F.lit(1)).otherwise(F.lit(0))
    x = F.round(F.col("o_totalprice") * 100, 0).cast("bigint").cast("double") / F.lit(
        _UNIT
    )
    x2 = x * x
    agg = orders.agg(
        F.sum(g1).cast("long").alias("n1"),
        F.sum(F.lit(1) - g1).cast("long").alias("n2"),
        fsum(F.when(g1 == 1, x).otherwise(F.lit(0.0)), scale=12).alias("sx"),
        fsum(F.when(g1 == 0, x).otherwise(F.lit(0.0)), scale=12).alias("sy"),
        fsum(F.when(g1 == 1, x2).otherwise(F.lit(0.0)), scale=14).alias("sx2"),
        fsum(F.when(g1 == 0, x2).otherwise(F.lit(0.0)), scale=14).alias("sy2"),
        fsum(F.when(g1 == 1, x2 * x2).otherwise(F.lit(0.0)), scale=14).alias("sx4"),
        fsum(F.when(g1 == 0, x2 * x2).otherwise(F.lit(0.0)), scale=14).alias("sy4"),
    )
    n1 = F.col("n1").cast("double")
    n2 = F.col("n2").cast("double")
    # Σ_{i≠j} k(x_i,x_j) = (Σx²)² − Σx⁴ + 2((Σx)² − Σx²) + n(n−1)
    kxx = (
        F.col("sx2") * F.col("sx2")
        - F.col("sx4")
        + F.lit(2.0) * (F.col("sx") * F.col("sx") - F.col("sx2"))
        + n1 * (n1 - F.lit(1.0))
    )
    kyy = (
        F.col("sy2") * F.col("sy2")
        - F.col("sy4")
        + F.lit(2.0) * (F.col("sy") * F.col("sy") - F.col("sy2"))
        + n2 * (n2 - F.lit(1.0))
    )
    kxy = (
        F.col("sx2") * F.col("sy2")
        + F.lit(2.0) * F.col("sx") * F.col("sy")
        + n1 * n2
    )
    mmd2 = (
        kxx / (n1 * (n1 - F.lit(1.0)))
        + kyy / (n2 * (n2 - F.lit(1.0)))
        - F.lit(2.0) * kxy / (n1 * n2)
    )
    return agg.select("n1", "n2", mmd2.alias("mmd2_unbiased"))


_ORACLE_MMD = f"""
WITH agg AS (
  SELECT
    CAST(SUM(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END) AS BIGINT) AS n1,
    CAST(SUM(CASE WHEN o_orderpriority = '1-URGENT' THEN 0 ELSE 1 END) AS BIGINT) AS n2,
    {sql_fsum("CASE WHEN o_orderpriority = '1-URGENT' THEN CAST(CAST(round(o_totalprice * 100, 0) AS BIGINT) AS DOUBLE) / 1000000000.0 ELSE 0.0 END", scale=12)} AS sx,
    {sql_fsum("CASE WHEN o_orderpriority = '1-URGENT' THEN 0.0 ELSE CAST(CAST(round(o_totalprice * 100, 0) AS BIGINT) AS DOUBLE) / 1000000000.0 END", scale=12)} AS sy,
    {sql_fsum("CASE WHEN o_orderpriority = '1-URGENT' THEN (CAST(CAST(round(o_totalprice * 100, 0) AS BIGINT) AS DOUBLE) / 1000000000.0) * (CAST(CAST(round(o_totalprice * 100, 0) AS BIGINT) AS DOUBLE) / 1000000000.0) ELSE 0.0 END", scale=14)} AS sx2,
    {sql_fsum("CASE WHEN o_orderpriority = '1-URGENT' THEN 0.0 ELSE (CAST(CAST(round(o_totalprice * 100, 0) AS BIGINT) AS DOUBLE) / 1000000000.0) * (CAST(CAST(round(o_totalprice * 100, 0) AS BIGINT) AS DOUBLE) / 1000000000.0) END", scale=14)} AS sy2,
    {sql_fsum("CASE WHEN o_orderpriority = '1-URGENT' THEN ((CAST(CAST(round(o_totalprice * 100, 0) AS BIGINT) AS DOUBLE) / 1000000000.0) * (CAST(CAST(round(o_totalprice * 100, 0) AS BIGINT) AS DOUBLE) / 1000000000.0)) * ((CAST(CAST(round(o_totalprice * 100, 0) AS BIGINT) AS DOUBLE) / 1000000000.0) * (CAST(CAST(round(o_totalprice * 100, 0) AS BIGINT) AS DOUBLE) / 1000000000.0)) ELSE 0.0 END", scale=14)} AS sx4,
    {sql_fsum("CASE WHEN o_orderpriority = '1-URGENT' THEN 0.0 ELSE ((CAST(CAST(round(o_totalprice * 100, 0) AS BIGINT) AS DOUBLE) / 1000000000.0) * (CAST(CAST(round(o_totalprice * 100, 0) AS BIGINT) AS DOUBLE) / 1000000000.0)) * ((CAST(CAST(round(o_totalprice * 100, 0) AS BIGINT) AS DOUBLE) / 1000000000.0) * (CAST(CAST(round(o_totalprice * 100, 0) AS BIGINT) AS DOUBLE) / 1000000000.0)) END", scale=14)} AS sy4
  FROM orders
)
SELECT n1, n2,
       ((sx2 * sx2 - sx4 + 2.0 * (sx * sx - sx2)
         + CAST(n1 AS DOUBLE) * (CAST(n1 AS DOUBLE) - 1.0))
          / (CAST(n1 AS DOUBLE) * (CAST(n1 AS DOUBLE) - 1.0)))
       + ((sy2 * sy2 - sy4 + 2.0 * (sy * sy - sy2)
           + CAST(n2 AS DOUBLE) * (CAST(n2 AS DOUBLE) - 1.0))
          / (CAST(n2 AS DOUBLE) * (CAST(n2 AS DOUBLE) - 1.0)))
       - 2.0 * ((sx2 * sy2 + 2.0 * sx * sy
                 + CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE))
                / (CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)))
         AS mmd2_unbiased
FROM agg
"""


# Gumbel method-of-moments constants, Python-precomputed (each is a fixed
# literal both engines carry verbatim — the LUT escape for scalars)
_GUMBEL_SQRT6_PI = 0.779696801233676  # sqrt(6)/pi
_GUMBEL_EULER = 0.5772156649015329
_GUMBEL_RETURN_T = 12  # return period in blocks (months)
_GUMBEL_CT = 2.441716398881459  # -ln(-ln(1 - 1/12))


def q_evt_gumbel_block_maxima(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Extreme-value analysis of daily revenue: MONTHLY block maxima
    fitted to a Gumbel distribution by method of moments (β = σ·√6/π,
    μ = m − γβ) and read out as the {t}-month RETURN LEVEL z_T = μ +
    β·c_T — "the daily revenue spike you should expect once a year" —
    the risk-planning question none of the mean/quantile entries answer
    (quantiles interpolate the observed range; EVT extrapolates the
    tail). Every transcendental in the chain (√6/π, Euler's γ, c_T =
    −ln(−ln(1−1/T)) for the FIXED T={t}) is a Python-precomputed literal;
    block maxima are exact integer cents, the two moments are
    floor-quantized sums in $10M units, σ uses the allowlisted sqrt.

    Scale shape: daily hash agg → monthly MAX hash agg (~84 rows) → one
    2-moment agg. Nothing after the first agg is data-sized."""
    daily = _daily_rev(spark, sf_dir)
    monthly_max = daily.groupBy(
        (F.year("d") * 12 + F.month("d")).alias("ym")
    ).agg(F.max("y").alias("mx"))
    v = F.col("mx").cast("double") / F.lit(_UNIT)
    agg = monthly_max.agg(
        F.count(F.lit(1)).cast("long").alias("n_blocks"),
        fsum(v, scale=10).alias("sv"),
        fsum(v * v, scale=10).alias("sv2"),
    )
    nd = F.col("n_blocks").cast("double")
    mean = F.col("sv") / nd
    var = (F.col("sv2") - F.col("sv") * F.col("sv") / nd) / (nd - F.lit(1.0))
    beta = F.sqrt(var) * F.lit(_GUMBEL_SQRT6_PI)
    mu = mean - F.lit(_GUMBEL_EULER) * beta
    scale_out = F.lit(10.0)  # $10M units → $M
    return agg.select(
        "n_blocks",
        (mean * scale_out).alias("mean_block_max_musd"),
        (mu * scale_out).alias("gumbel_mu_musd"),
        (beta * scale_out).alias("gumbel_beta_musd"),
        ((mu + beta * F.lit(_GUMBEL_CT)) * scale_out).alias(
            "return_level_12mo_musd"
        ),
    )
q_evt_gumbel_block_maxima.__doc__ = q_evt_gumbel_block_maxima.__doc__ and q_evt_gumbel_block_maxima.__doc__.format(
        t=_GUMBEL_RETURN_T
    )


_ORACLE_GUMBEL = f"""
WITH daily AS ({_SQL_DAILY}
), monthly_max AS (
  SELECT YEAR(d) * 12 + MONTH(d) AS ym, MAX(y) AS mx
  FROM daily GROUP BY 1
), agg AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_blocks,
         {sql_fsum("CAST(mx AS DOUBLE) / 1000000000.0", scale=10)} AS sv,
         {sql_fsum("(CAST(mx AS DOUBLE) / 1000000000.0) * (CAST(mx AS DOUBLE) / 1000000000.0)", scale=10)} AS sv2
  FROM monthly_max
), fit AS (
  SELECT n_blocks,
         sv / CAST(n_blocks AS DOUBLE) AS mean,
         sqrt((sv2 - sv * sv / CAST(n_blocks AS DOUBLE))
              / (CAST(n_blocks AS DOUBLE) - 1.0)) * {_GUMBEL_SQRT6_PI!r} AS beta
  FROM agg
)
SELECT n_blocks,
       mean * 10.0 AS mean_block_max_musd,
       (mean - {_GUMBEL_EULER!r} * beta) * 10.0 AS gumbel_mu_musd,
       beta * 10.0 AS gumbel_beta_musd,
       ((mean - {_GUMBEL_EULER!r} * beta) + beta * {_GUMBEL_CT!r}) * 10.0
         AS return_level_12mo_musd
FROM fit
"""


# ---------------------------------------------------------------------------
# Method-agreement pair (round 10 wave 4): Lin's CCC + Bland-Altman
# ---------------------------------------------------------------------------


def _monthly_two_measures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shared agreement frame: per ship-month, the GROSS monthly revenue
    (list price) and the NET monthly revenue (after discount) — two
    measurements of the same quantity by two 'instruments', the canonical
    input shape for method-agreement statistics. Both are exact integer
    cent sums from ONE map-side-combinable hash agg; the ~84-month output
    is domain-sized."""
    li = load_table(spark, sf_dir, "lineitem")
    gross = F.round(F.col("l_extendedprice") * 100, 0).cast("bigint")
    net = F.round(
        F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount")) * 100, 0
    ).cast("bigint")
    return li.groupBy(F.date_trunc("month", "l_shipdate").alias("m")).agg(
        F.sum(gross).cast("long").alias("gc"),
        F.sum(net).cast("long").alias("nc"),
    )


_SQL_MONTHLY_TWO = """
  SELECT date_trunc('month', l_shipdate) AS m,
         CAST(SUM(CAST(round(l_extendedprice * 100, 0) AS BIGINT)) AS BIGINT) AS gc,
         CAST(SUM(CAST(round(l_extendedprice * (1.0 - l_discount) * 100, 0) AS BIGINT)) AS BIGINT) AS nc
  FROM lineitem GROUP BY 1
"""


def q_lin_ccc_agreement(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lin's concordance correlation coefficient between gross and net
    monthly revenue — the method-agreement statistic Pearson's r cannot
    be: r is blind to scale and location bias (y = 2x + 5 has r = 1),
    while CCC = 2·s_xy / (s_x² + s_y² + (x̄−ȳ)²) charges for both, which
    is what "would switching measurement pipelines change the numbers?"
    actually asks. Ships the standard decomposition too: CCC = r · C_b
    with scale shift v = s_x/s_y and location shift u = (x̄−ȳ)/√(s_x·s_y).

    Exactness: monthly cents are exact bigints, so the MEANS are exact
    rationals (Σcents/n — one division); the variances/covariance are
    CENTERED on those means BEFORE squaring (raw-moment sxx − sx²/n
    cancellation cost ~2 digits here, measured against the numpy ground
    truth while testing) and floor-quantized (fsum scale 12 on O(0.1)
    deviations in $10M units). Every shipped float is one fixed IEEE
    sequence on these. Scale shape: one data-sized hash agg (the
    monthly frame), one exact 2-sum agg, one broadcast re-pass over the
    ~84-month frame for the centered moments.

    Reference analog: none (engine addition, SURVEY.md §2.7)."""
    monthly = _monthly_two_measures(spark, sf_dir)
    tot = monthly.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("gc").cast("long").alias("tgc"),
        F.sum("nc").cast("long").alias("tnc"),
    )
    joined = monthly.crossJoin(F.broadcast(tot))
    nd0 = F.col("n").cast("double")
    mx0 = F.col("tgc").cast("double") / nd0 / F.lit(_UNIT)
    my0 = F.col("tnc").cast("double") / nd0 / F.lit(_UNIT)
    dx = F.col("gc").cast("double") / F.lit(_UNIT) - mx0
    dy = F.col("nc").cast("double") / F.lit(_UNIT) - my0
    m = joined.agg(
        F.max("n").alias("n"),
        F.max("tgc").alias("tgc"),
        F.max("tnc").alias("tnc"),
        fsum(dx * dx, scale=12).alias("sxx"),
        fsum(dy * dy, scale=12).alias("syy"),
        fsum(dx * dy, scale=12).alias("sxy"),
    )
    nd = F.col("n").cast("double")
    mx = F.col("tgc").cast("double") / nd / F.lit(_UNIT)
    my = F.col("tnc").cast("double") / nd / F.lit(_UNIT)
    vx = F.col("sxx") / nd
    vy = F.col("syy") / nd
    cov = F.col("sxy") / nd
    r = cov / F.sqrt(vx * vy)
    ccc = F.lit(2.0) * cov / (vx + vy + (mx - my) * (mx - my))
    return m.select(
        F.col("n").alias("n_months"),
        r.alias("pearson_r"),
        ccc.alias("lin_ccc"),
        (ccc / r).alias("bias_correction_cb"),
        F.sqrt(vx / vy).alias("scale_shift_v"),
        ((mx - my) / F.sqrt(F.sqrt(vx * vy))).alias("location_shift_u"),
    )


_ORACLE_LIN_CCC = f"""
WITH monthly AS ({_SQL_MONTHLY_TWO}
), tot AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(gc) AS BIGINT) AS tgc,
         CAST(SUM(nc) AS BIGINT) AS tnc
  FROM monthly
), m AS (
  SELECT MAX(n) AS n, MAX(tgc) AS tgc, MAX(tnc) AS tnc,
         {sql_fsum("(CAST(gc AS DOUBLE) / 1000000000.0 - CAST(tgc AS DOUBLE) / CAST(n AS DOUBLE) / 1000000000.0) * (CAST(gc AS DOUBLE) / 1000000000.0 - CAST(tgc AS DOUBLE) / CAST(n AS DOUBLE) / 1000000000.0)", scale=12)} AS sxx,
         {sql_fsum("(CAST(nc AS DOUBLE) / 1000000000.0 - CAST(tnc AS DOUBLE) / CAST(n AS DOUBLE) / 1000000000.0) * (CAST(nc AS DOUBLE) / 1000000000.0 - CAST(tnc AS DOUBLE) / CAST(n AS DOUBLE) / 1000000000.0)", scale=12)} AS syy,
         {sql_fsum("(CAST(gc AS DOUBLE) / 1000000000.0 - CAST(tgc AS DOUBLE) / CAST(n AS DOUBLE) / 1000000000.0) * (CAST(nc AS DOUBLE) / 1000000000.0 - CAST(tnc AS DOUBLE) / CAST(n AS DOUBLE) / 1000000000.0)", scale=12)} AS sxy
  FROM monthly CROSS JOIN tot
), d AS (
  SELECT n,
         CAST(tgc AS DOUBLE) / CAST(n AS DOUBLE) / 1000000000.0 AS mx,
         CAST(tnc AS DOUBLE) / CAST(n AS DOUBLE) / 1000000000.0 AS my,
         sxx / CAST(n AS DOUBLE) AS vx,
         syy / CAST(n AS DOUBLE) AS vy,
         sxy / CAST(n AS DOUBLE) AS cov
  FROM m
)
SELECT n AS n_months,
       cov / sqrt(vx * vy) AS pearson_r,
       (2.0 * cov / (vx + vy + (mx - my) * (mx - my))) AS lin_ccc,
       (2.0 * cov / (vx + vy + (mx - my) * (mx - my))) / (cov / sqrt(vx * vy))
         AS bias_correction_cb,
       sqrt(vx / vy) AS scale_shift_v,
       (mx - my) / sqrt(sqrt(vx * vy)) AS location_shift_u
FROM d
"""


BA_Z = 1.96  # the conventional 95% limits-of-agreement multiplier


def q_bland_altman_agreement(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bland-Altman limits of agreement between gross and net monthly
    revenue — the companion readout of ``lin_ccc_agreement``: instead of
    one correlation-like score, it ships the clinically-interpretable
    band (mean difference ± 1.96·SD) inside which the two measurement
    methods agree, plus the empirical share of months actually inside
    the band (the check that the normal-differences assumption holds).

    Exactness: monthly diffs d = (gross − net) cents are exact bigints
    scaled once to $10M units; the MEAN diff is the exact rational
    Σ(gc−nc)/n, and the SD sums squares of deviations CENTERED on it
    (fsum scale 12 — no raw-moment cancellation, same lesson as
    ``lin_ccc_agreement``); the within-band count is a comparison of
    each d against the broadcast scalar band. The SD carries a
    quantization bound of ~2·10⁻⁸ relative (scale-12 quantum under the
    ~10⁻⁵-magnitude squared deviations at sf0.001 — measured against
    the numpy ground truth in tests). Scale shape: one data-sized hash
    agg, one exact 1-sum agg, two broadcast re-passes over the
    ~84-month frame.

    Reference analog: none (engine addition, SURVEY.md §2.7)."""
    monthly = _monthly_two_measures(spark, sf_dir).select(
        "m", ((F.col("gc") - F.col("nc")).cast("double") / F.lit(_UNIT)).alias("d")
    )
    base = _monthly_two_measures(spark, sf_dir).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.col("gc") - F.col("nc")).cast("long").alias("tdc"),
    )
    nd0 = F.col("n").cast("double")
    mean0 = F.col("tdc").cast("double") / nd0 / F.lit(_UNIT)
    stats = (
        monthly.crossJoin(F.broadcast(base))
        .agg(
            F.max("n").alias("n"),
            F.max("tdc").alias("tdc"),
            fsum((F.col("d") - mean0) * (F.col("d") - mean0), scale=12).alias("sdd"),
        )
    )
    nd = F.col("n").cast("double")
    mean_d = F.col("tdc").cast("double") / nd / F.lit(_UNIT)
    sd = F.sqrt(F.col("sdd") / (nd - F.lit(1.0)))
    band = stats.select(
        "n",
        mean_d.alias("mean_d"),
        sd.alias("sd_d"),
        (mean_d - F.lit(BA_Z) * sd).alias("lo"),
        (mean_d + F.lit(BA_Z) * sd).alias("hi"),
    )
    within = (
        monthly.crossJoin(F.broadcast(band))
        .agg(
            F.max("n").alias("n"),
            F.max("mean_d").alias("mean_d"),
            F.max("sd_d").alias("sd_d"),
            F.max("lo").alias("lo"),
            F.max("hi").alias("hi"),
            F.sum(
                F.when(
                    (F.col("d") >= F.col("lo")) & (F.col("d") <= F.col("hi")), 1
                ).otherwise(0)
            )
            .cast("long")
            .alias("n_within"),
        )
    )
    u_dollars = F.lit(_UNIT / 100.0)
    return within.select(
        F.col("n").alias("n_months"),
        (F.col("mean_d") * u_dollars).alias("mean_diff_dollars"),
        (F.col("sd_d") * u_dollars).alias("sd_diff_dollars"),
        (F.col("lo") * u_dollars).alias("loa_lower_dollars"),
        (F.col("hi") * u_dollars).alias("loa_upper_dollars"),
        "n_within",
        (F.col("n_within").cast("double") / F.col("n").cast("double")).alias(
            "share_within"
        ),
    )


_ORACLE_BLAND_ALTMAN = f"""
WITH monthly AS (
  SELECT m, CAST(gc - nc AS DOUBLE) / 1000000000.0 AS d
  FROM ({_SQL_MONTHLY_TWO})
), base AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(gc - nc) AS BIGINT) AS tdc
  FROM ({_SQL_MONTHLY_TWO})
), stats AS (
  SELECT MAX(n) AS n, MAX(tdc) AS tdc,
         {sql_fsum("(d - CAST(tdc AS DOUBLE) / CAST(n AS DOUBLE) / 1000000000.0) * (d - CAST(tdc AS DOUBLE) / CAST(n AS DOUBLE) / 1000000000.0)", scale=12)} AS sdd
  FROM monthly CROSS JOIN base
), band AS (
  SELECT n,
         CAST(tdc AS DOUBLE) / CAST(n AS DOUBLE) / 1000000000.0 AS mean_d,
         sqrt(sdd / (CAST(n AS DOUBLE) - 1.0)) AS sd_d,
         CAST(tdc AS DOUBLE) / CAST(n AS DOUBLE) / 1000000000.0
           - {BA_Z} * sqrt(sdd / (CAST(n AS DOUBLE) - 1.0)) AS lo,
         CAST(tdc AS DOUBLE) / CAST(n AS DOUBLE) / 1000000000.0
           + {BA_Z} * sqrt(sdd / (CAST(n AS DOUBLE) - 1.0)) AS hi
  FROM stats
), within AS (
  SELECT MAX(n) AS n, MAX(mean_d) AS mean_d, MAX(sd_d) AS sd_d,
         MAX(lo) AS lo, MAX(hi) AS hi,
         CAST(SUM(CASE WHEN d >= lo AND d <= hi THEN 1 ELSE 0 END) AS BIGINT) AS n_within
  FROM monthly CROSS JOIN band
)
SELECT n AS n_months,
       mean_d * 10000000.0 AS mean_diff_dollars,
       sd_d * 10000000.0 AS sd_diff_dollars,
       lo * 10000000.0 AS loa_lower_dollars,
       hi * 10000000.0 AS loa_upper_dollars,
       n_within,
       CAST(n_within AS DOUBLE) / CAST(n AS DOUBLE) AS share_within
FROM within
"""


GAMMA_QTY_BAND = 17  # quantity band width: 1-17 / 18-34 / 35-50


def q_goodman_kruskal_gamma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Goodman-Kruskal gamma between order PRIORITY (ordinal 1..5) and
    line-item QUANTITY band (ordinal terciles of the 1..50 integer
    domain) — ordinal-×-ordinal association on a contingency grid, the
    regime ``kendall_tau`` (continuous pairs) and ``cramers_v`` (nominal,
    order-blind) both miss. γ = (C − D)/(C + D) over concordant/
    discordant pairs, computed from the ≤15 CELL COUNTS (one hash agg),
    never from row pairs: C = Σ n_ij·n_kl over cell pairs with i<k, j<l —
    a 15×15 literal-domain cross of the cell frame, so the O(n²) pair
    space collapses to O(cells²) regardless of data size.

    Exactness: cell counts are integers; the C/D products are
    DECIMAL(38,0) (n_ij·n_kl reaches ~10²⁴ at 100 TB — past bigint);
    γ is one division — NULL on both engines in the degenerate case
    C + D = 0 (every untied pair impossible, e.g. a constant column).
    Scale shape: one orders⋈lineitem join (the canonical fact join),
    one hash agg to ≤15 rows, then arithmetic.

    Reference analog: none (engine addition, SURVEY.md §2.7)."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.substring("o_orderpriority", 1, 1).cast("int").alias("xo"),
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        F.least(
            F.lit(2),
            F.floor((F.col("l_quantity") - 1) / F.lit(GAMMA_QTY_BAND)).cast("int"),
        ).alias("yo"),
    )
    cells = (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .groupBy("xo", "yo")
        .agg(F.count(F.lit(1)).cast("decimal(38,0)").alias("cnt"))
    )
    a = cells.select(
        F.col("xo").alias("xa"), F.col("yo").alias("ya"), F.col("cnt").alias("na")
    )
    b = cells.select(
        F.col("xo").alias("xb"), F.col("yo").alias("yb"), F.col("cnt").alias("nb")
    )
    pairs = a.join(F.broadcast(b), F.col("xa") < F.col("xb"))
    agg = pairs.agg(
        F.sum(
            F.when(F.col("ya") < F.col("yb"), F.col("na") * F.col("nb")).otherwise(
                F.lit(0).cast("decimal(38,0)")
            )
        ).alias("c_pairs"),
        F.sum(
            F.when(F.col("ya") > F.col("yb"), F.col("na") * F.col("nb")).otherwise(
                F.lit(0).cast("decimal(38,0)")
            )
        ).alias("d_pairs"),
    )
    c = F.col("c_pairs").cast("double")
    d = F.col("d_pairs").cast("double")
    # ship the pair counts as DOUBLE (exact here; the pandas-canonical
    # rendering of wide DECIMALs splits between engines — house rule)
    return agg.select(
        c.alias("concordant"),
        d.alias("discordant"),
        ((c - d) / (c + d)).alias("gamma"),
    )


_ORACLE_GK_GAMMA = f"""
WITH cells AS (
  SELECT CAST(substr(o_orderpriority, 1, 1) AS INT) AS xo,
         CAST(least(2, CAST(floor((l_quantity - 1) / {GAMMA_QTY_BAND}) AS INT)) AS INT) AS yo,
         CAST(COUNT(*) AS DECIMAL(38,0)) AS cnt
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  GROUP BY 1, 2
), agg AS (
  SELECT SUM(CASE WHEN a.yo < b.yo THEN a.cnt * b.cnt ELSE CAST(0 AS DECIMAL(38,0)) END) AS c_pairs,
         SUM(CASE WHEN a.yo > b.yo THEN a.cnt * b.cnt ELSE CAST(0 AS DECIMAL(38,0)) END) AS d_pairs
  FROM cells a JOIN cells b ON a.xo < b.xo
)
SELECT CAST(c_pairs AS DOUBLE) AS concordant,
       CAST(d_pairs AS DOUBLE) AS discordant,
       (CAST(c_pairs AS DOUBLE) - CAST(d_pairs AS DOUBLE))
         / (CAST(c_pairs AS DOUBLE) + CAST(d_pairs AS DOUBLE)) AS gamma
FROM agg
"""


# ---------------------------------------------------------------------------
# Decision-stump Gini split gain (round 10 wave 4)
# ---------------------------------------------------------------------------


def q_gini_split_gain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decision-stump split search: for every candidate threshold on
    l_discount, the Gini-impurity GAIN of splitting line items into
    (discount ≤ θ | discount > θ) when predicting the returned flag —
    the exact computation a distributed decision-tree learner runs at
    every node, and the feature-screening readout ("is discount
    predictive of returns at all, and where is the best cut?") that
    precedes any model. Gini(p) = 2p(1−p) is fully RATIONAL — the
    reason trees use it over entropy — so the whole search fits the
    no-transcendentals gate contract.

    Exactness: per-threshold left/right class counts come from ONE
    hash agg over the ~11-value discount domain plus a cumulative
    window on that domain-sized frame; every gain is one IEEE sequence
    on exact integers. Ships ALL candidate rows (threshold order) with
    an is_best flag — max gain, ties broken by lowest threshold.
    Scale shape: one map-side-combinable hash agg; everything after
    runs on ≤11 rows."""
    li = load_table(spark, sf_dir, "lineitem")
    per_v = (
        li.select(
            F.round(F.col("l_discount") * 100, 0).cast("int").alias("disc_pct"),
            F.when(F.col("l_returnflag") == "R", 1).otherwise(0).alias("pos"),
        )
        .groupBy("disc_pct")
        .agg(
            F.count(F.lit(1)).cast("long").alias("cnt"),
            F.sum("pos").cast("long").alias("pos"),
        )
    )
    w = Window.orderBy("disc_pct").rowsBetween(Window.unboundedPreceding, 0)
    cum = per_v.select(
        "disc_pct",
        F.sum("cnt").over(w).alias("n_left"),
        F.sum("pos").over(w).alias("pos_left"),
    )
    tot = per_v.agg(
        F.sum("cnt").cast("long").alias("n"), F.sum("pos").cast("long").alias("p")
    )
    cand = cum.crossJoin(F.broadcast(tot)).filter(F.col("n_left") < F.col("n"))
    nd = F.col("n").cast("double")
    pd_ = F.col("p").cast("double")
    nl = F.col("n_left").cast("double")
    pl = F.col("pos_left").cast("double")
    nr = nd - nl
    pr = pd_ - pl
    gini = lambda p, n: F.lit(2.0) * (p / n) * (F.lit(1.0) - p / n)  # noqa: E731
    gain = gini(pd_, nd) - (nl / nd) * gini(pl, nl) - (nr / nd) * gini(pr, nr)
    scored = cand.select(
        "disc_pct",
        F.col("n_left").cast("long").alias("n_left"),
        F.col("pos_left").cast("long").alias("pos_left"),
        (F.col("n") - F.col("n_left")).cast("long").alias("n_right"),
        (F.col("p") - F.col("pos_left")).cast("long").alias("pos_right"),
        gain.alias("gini_gain"),
    )
    w_best = Window.orderBy(F.col("gini_gain").desc(), F.col("disc_pct").asc())
    return (
        scored.withColumn(
            "is_best", (F.row_number().over(w_best) == 1).cast("int")
        )
        .orderBy("disc_pct")
    )


_ORACLE_GINI_SPLIT = """
WITH per_v AS (
  SELECT CAST(round(l_discount * 100, 0) AS INT) AS disc_pct,
         CAST(COUNT(*) AS BIGINT) AS cnt,
         CAST(SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS BIGINT) AS pos
  FROM lineitem GROUP BY 1
), cum AS (
  SELECT disc_pct,
         SUM(cnt) OVER (ORDER BY disc_pct
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS n_left,
         SUM(pos) OVER (ORDER BY disc_pct
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pos_left
  FROM per_v
), tot AS (
  SELECT CAST(SUM(cnt) AS BIGINT) AS n, CAST(SUM(pos) AS BIGINT) AS p FROM per_v
), cand AS (
  SELECT disc_pct,
         CAST(n_left AS BIGINT) AS n_left,
         CAST(pos_left AS BIGINT) AS pos_left,
         CAST(n - n_left AS BIGINT) AS n_right,
         CAST(p - pos_left AS BIGINT) AS pos_right,
         (2.0 * (CAST(p AS DOUBLE) / CAST(n AS DOUBLE)) * (1.0 - CAST(p AS DOUBLE) / CAST(n AS DOUBLE)))
         - (CAST(n_left AS DOUBLE) / CAST(n AS DOUBLE))
             * (2.0 * (CAST(pos_left AS DOUBLE) / CAST(n_left AS DOUBLE))
                * (1.0 - CAST(pos_left AS DOUBLE) / CAST(n_left AS DOUBLE)))
         - ((CAST(n AS DOUBLE) - CAST(n_left AS DOUBLE)) / CAST(n AS DOUBLE))
             * (2.0 * ((CAST(p AS DOUBLE) - CAST(pos_left AS DOUBLE)) / (CAST(n AS DOUBLE) - CAST(n_left AS DOUBLE)))
                * (1.0 - (CAST(p AS DOUBLE) - CAST(pos_left AS DOUBLE)) / (CAST(n AS DOUBLE) - CAST(n_left AS DOUBLE))))
           AS gini_gain
  FROM cum CROSS JOIN tot
  WHERE n_left < n
)
SELECT disc_pct, n_left, pos_left, n_right, pos_right, gini_gain,
       CAST(CASE WHEN ROW_NUMBER() OVER (ORDER BY gini_gain DESC, disc_pct ASC) = 1
                 THEN 1 ELSE 0 END AS INT) AS is_best
FROM cand
ORDER BY disc_pct
"""


# ---------------------------------------------------------------------------
# Intraclass correlation ICC(1) (round 10 wave 4)
# ---------------------------------------------------------------------------

ICC_YEAR = 1997
ICC_K = 12  # raters = the 12 months of ICC_YEAR


def q_icc_oneway(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-way intraclass correlation ICC(1) of monthly nation revenue —
    "how much of the month-to-month revenue variance is a stable NATION
    signal vs noise?", the reliability coefficient behind every
    repeated-measures design (and the k-rater continuous companion of
    ``fleiss_kappa``'s categorical agreement): ICC(1) = (MSB − MSW) /
    (MSB + (k−1)·MSW) from the one-way ANOVA mean squares over the
    balanced nation × month grid (zero-filled from the literal month
    spine × nation dim, so every subject has exactly k={k} ratings).
    Also ships ICC(k) (Spearman-Brown: reliability of the 12-month MEAN)
    and the ANOVA F.

    Exactness: cell revenues are exact cents; per-nation and grand
    means are exact rationals (integer sums, one division); both sums
    of squares are CENTERED on those means before squaring (the
    ``lin_ccc_agreement`` cancellation lesson) and floor-quantized at
    scale 12 — quantization bounds the mean squares at ~10⁻⁸ relative
    when cell values are tiny (sf0.001; measured in tests), engine-
    identical always. Scale shape: one data-sized orders⋈customer hash agg to
    the ≤|nations|×12 grid; everything after is domain-sized."""
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    nation = load_table(spark, sf_dir, "nation").select("n_nationkey")
    rev = (
        orders.filter(F.year("o_orderdate") == ICC_YEAR)
        .join(cust, orders["o_custkey"] == cust["c_custkey"])
        .groupBy(
            F.col("c_nationkey").alias("nk"),
            F.month("o_orderdate").alias("mth"),
        )
        .agg(
            F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("bigint"))
            .cast("long")
            .alias("cents")
        )
    )
    months = spark.range(1, ICC_K + 1).select(F.col("id").cast("int").alias("mth"))
    spine = nation.crossJoin(F.broadcast(months)).select(
        F.col("n_nationkey").alias("nk"), "mth"
    )
    grid = spine.join(rev, ["nk", "mth"], "left").select(
        "nk", "mth", F.coalesce(F.col("cents"), F.lit(0)).cast("long").alias("cents")
    )
    per_n = grid.groupBy("nk").agg(F.sum("cents").cast("long").alias("s_i"))
    tot = per_n.agg(
        F.count(F.lit(1)).cast("long").alias("n_groups"),
        F.sum("s_i").cast("long").alias("t"),
    )
    kd = F.lit(float(ICC_K))
    # SSB over the n-group frame, deviations of exact rational means
    ssb_frame = per_n.crossJoin(F.broadcast(tot))
    dev_b = (
        F.col("s_i").cast("double") / kd
        - F.col("t").cast("double") / (F.col("n_groups").cast("double") * kd)
    ) / F.lit(_UNIT)
    ssb = ssb_frame.agg(
        F.max("n_groups").alias("n_groups"),
        (fsum(dev_b * dev_b, scale=12) * kd).alias("ssb"),
    )
    # SSW over the grid, deviations from the exact per-nation mean
    ssw_frame = grid.join(per_n, "nk")
    dev_w = (
        F.col("cents").cast("double") - F.col("s_i").cast("double") / kd
    ) / F.lit(_UNIT)
    ssw = ssw_frame.agg(fsum(dev_w * dev_w, scale=12).alias("ssw"))
    both = ssb.crossJoin(F.broadcast(ssw))
    nd = F.col("n_groups").cast("double")
    msb = F.col("ssb") / (nd - F.lit(1.0))
    msw = F.col("ssw") / (nd * (kd - F.lit(1.0)))
    icc1 = (msb - msw) / (msb + (kd - F.lit(1.0)) * msw)
    return both.select(
        "n_groups",
        F.lit(ICC_K).cast("int").alias("k_raters"),
        msb.alias("ms_between"),
        msw.alias("ms_within"),
        (msb / msw).alias("f_stat"),
        icc1.alias("icc1"),
        ((msb - msw) / msb).alias("icc_k"),
    )
q_icc_oneway.__doc__ = q_icc_oneway.__doc__ and q_icc_oneway.__doc__.format(
        k=ICC_K
    )


_ORACLE_ICC = f"""
WITH rev AS (
  SELECT c_nationkey AS nk, month(o_orderdate) AS mth,
         CAST(SUM(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT) AS cents
  FROM orders JOIN customer ON o_custkey = c_custkey
  WHERE year(o_orderdate) = {ICC_YEAR}
  GROUP BY 1, 2
), spine AS (
  SELECT n_nationkey AS nk, CAST(m AS INT) AS mth
  FROM nation CROSS JOIN (SELECT UNNEST(range(1, {ICC_K + 1})) AS m)
), grid AS (
  SELECT spine.nk, spine.mth,
         CAST(COALESCE(rev.cents, 0) AS BIGINT) AS cents
  FROM spine LEFT JOIN rev ON spine.nk = rev.nk AND spine.mth = rev.mth
), per_n AS (
  SELECT nk, CAST(SUM(cents) AS BIGINT) AS s_i FROM grid GROUP BY 1
), tot AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_groups, CAST(SUM(s_i) AS BIGINT) AS t
  FROM per_n
), ssb AS (
  SELECT MAX(n_groups) AS n_groups,
         {sql_fsum(f"((CAST(s_i AS DOUBLE) / {float(ICC_K)!r} - CAST(t AS DOUBLE) / (CAST(n_groups AS DOUBLE) * {float(ICC_K)!r})) / 1000000000.0) * ((CAST(s_i AS DOUBLE) / {float(ICC_K)!r} - CAST(t AS DOUBLE) / (CAST(n_groups AS DOUBLE) * {float(ICC_K)!r})) / 1000000000.0)", scale=12)} * {float(ICC_K)!r} AS ssb
  FROM per_n CROSS JOIN tot
), ssw AS (
  SELECT {sql_fsum(f"((CAST(cents AS DOUBLE) - CAST(s_i AS DOUBLE) / {float(ICC_K)!r}) / 1000000000.0) * ((CAST(cents AS DOUBLE) - CAST(s_i AS DOUBLE) / {float(ICC_K)!r}) / 1000000000.0)", scale=12)} AS ssw
  FROM grid JOIN per_n USING (nk)
), d AS (
  SELECT n_groups,
         ssb / (CAST(n_groups AS DOUBLE) - 1.0) AS msb,
         ssw / (CAST(n_groups AS DOUBLE) * ({float(ICC_K)!r} - 1.0)) AS msw
  FROM ssb CROSS JOIN ssw
)
SELECT n_groups,
       CAST({ICC_K} AS INT) AS k_raters,
       msb AS ms_between,
       msw AS ms_within,
       msb / msw AS f_stat,
       (msb - msw) / (msb + ({float(ICC_K)!r} - 1.0) * msw) AS icc1,
       (msb - msw) / msb AS icc_k
FROM d
"""


# ---------------------------------------------------------------------------
# Stuart-Maxwell marginal-homogeneity test (round 10 wave 5)
# ---------------------------------------------------------------------------

SM_YEAR_A = 1996
SM_YEAR_B = 1997
SM_CHI2_CRIT_DF2 = 5.991465  # chi-square(2) upper 5% — literal, no CDFs


def _sm_tercile(orders: DataFrame, year: int, name: str) -> DataFrame:
    """Per-customer revenue TERCILE within one year: competition ranking
    by exact cent revenue (custkey tie-break), tercile = ⌊3(r−1)/n⌋ —
    pure integer arithmetic on the rank, no quantile interpolation."""
    per_cust = (
        orders.filter(F.year("o_orderdate") == year)
        .groupBy("o_custkey")
        .agg(
            F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("bigint"))
            .cast("long")
            .alias("rev")
        )
    )
    n_tbl = per_cust.agg(F.count(F.lit(1)).cast("long").alias("_n"))
    # rank via the shared _cum_prev bucketed decomposition (r14
    # optimization — no single-task sort; DESC order ranks by the exact
    # long negation). explicit floor: DuckDB's double→INT CAST
    # rounds-to-nearest while Spark's truncates — floor() is the one
    # both engines agree on
    return (
        _cum_prev(
            per_cust.withColumn("_negrev", -F.col("rev")),
            ["_negrev", "o_custkey"],
            {"_rp": F.lit(1)},
            materialize=True,
        )
        .crossJoin(F.broadcast(n_tbl))
        .select(
            "o_custkey",
            F.floor((F.lit(3) * F.col("_rp")) / F.col("_n")).cast("int").alias(name),
        )
    )


def _sql_sm_tercile(year: int, name: str) -> str:
    return f"""
  SELECT o_custkey,
         CAST(floor((3 * (ROW_NUMBER() OVER (ORDER BY rev DESC, o_custkey ASC) - 1))
              / COUNT(*) OVER ()) AS INT) AS {name}
  FROM (
    SELECT o_custkey,
           CAST(SUM(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT) AS rev
    FROM orders WHERE year(o_orderdate) = {year} GROUP BY 1
  )
"""


def q_stuart_maxwell_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stuart-Maxwell marginal-homogeneity test: did the DISTRIBUTION of
    customers across revenue terciles shift between {a} and {b}? The
    k-category generalization of ``mcnemar_paired`` (k=2): each customer
    active in both years is a paired categorical observation; the test
    asks whether the two marginal distributions of the 3×3 transition
    table differ, with the closed-form 2×2-inverse χ² =
    (d₁²V₂₂ + d₂²V₁₁ − 2d₁d₂V₁₂)/(V₁₁V₂₂ − V₁₂²), d_i = row_i − col_i,
    V_ii = row_i + col_i − 2n_ii, V_ij = −(n_ij + n_ji) — fully RATIONAL,
    no matrix solver. The readout behind "did our customer base migrate
    upmarket?" that ``customer_migration_matrix`` (decision.py) shows
    but does not test.

    Exactness: terciles are integer ranks (competition ranking, custkey
    tie-break); the 9 transition cells are one hash agg; χ² is one IEEE
    sequence on exact integers; significance is a rational comparison
    against the literal χ²(2) critical value. Scale shape: two year
    aggs + global rank windows (the ``global_rank_bucketed`` prefix-sum
    drops in past one task), one join, one 9-cell agg."""
    orders = load_table(spark, sf_dir, "orders")
    ta = _sm_tercile(orders, SM_YEAR_A, "ca")
    tb = _sm_tercile(orders, SM_YEAR_B, "cb")
    cells = (
        ta.join(tb, "o_custkey")
        .groupBy("ca", "cb")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    flat = cells.agg(
        *[
            F.sum(F.when((F.col("ca") == i) & (F.col("cb") == j), F.col("n")).otherwise(0))
            .cast("long")
            .alias(f"n{i}{j}")
            for i in range(3)
            for j in range(3)
        ]
    )

    def row(i):
        return sum(
            (F.col(f"n{i}{j}") for j in range(1, 3)), F.col(f"n{i}0")
        ).cast("double")

    def col(j):
        return sum(
            (F.col(f"n{i}{j}") for i in range(1, 3)), F.col(f"n0{j}")
        ).cast("double")

    d1 = row(0) - col(0)
    d2 = row(1) - col(1)
    v11 = row(0) + col(0) - F.lit(2.0) * F.col("n00").cast("double")
    v22 = row(1) + col(1) - F.lit(2.0) * F.col("n11").cast("double")
    v12 = -(F.col("n01") + F.col("n10")).cast("double")
    chi2 = (d1 * d1 * v22 + d2 * d2 * v11 - F.lit(2.0) * d1 * d2 * v12) / (
        v11 * v22 - v12 * v12
    )
    n_sub = sum(
        (F.col(f"n{i}{j}") for i in range(3) for j in range(3) if (i, j) != (0, 0)),
        F.col("n00"),
    )
    return flat.select(
        n_sub.cast("long").alias("n_paired"),
        d1.alias("d_low"),
        d2.alias("d_mid"),
        chi2.alias("chi2_stat"),
        F.lit(2).cast("int").alias("df"),
        (chi2 > F.lit(SM_CHI2_CRIT_DF2)).cast("int").alias("significant_5pct"),
    )
q_stuart_maxwell_test.__doc__ = q_stuart_maxwell_test.__doc__ and q_stuart_maxwell_test.__doc__.format(
        a=SM_YEAR_A, b=SM_YEAR_B
    )


def _sql_stuart_maxwell() -> str:
    n_cells = ",\n         ".join(
        f"CAST(SUM(CASE WHEN ca = {i} AND cb = {j} THEN 1 ELSE 0 END) AS BIGINT) AS n{i}{j}"
        for i in range(3)
        for j in range(3)
    )
    row0 = "CAST(n00 + n01 + n02 AS DOUBLE)"
    row1 = "CAST(n10 + n11 + n12 AS DOUBLE)"
    col0 = "CAST(n00 + n10 + n20 AS DOUBLE)"
    col1 = "CAST(n01 + n11 + n21 AS DOUBLE)"
    d1 = f"({row0} - {col0})"
    d2 = f"({row1} - {col1})"
    v11 = f"({row0} + {col0} - 2.0 * CAST(n00 AS DOUBLE))"
    v22 = f"({row1} + {col1} - 2.0 * CAST(n11 AS DOUBLE))"
    v12 = "(-CAST(n01 + n10 AS DOUBLE))"
    chi2 = (
        f"(({d1} * {d1} * {v22} + {d2} * {d2} * {v11}"
        f" - 2.0 * {d1} * {d2} * {v12})"
        f" / ({v11} * {v22} - {v12} * {v12}))"
    )
    total = " + ".join(f"n{i}{j}" for i in range(3) for j in range(3))
    return f"""
WITH ta AS ({_sql_sm_tercile(SM_YEAR_A, "ca")}
), tb AS ({_sql_sm_tercile(SM_YEAR_B, "cb")}
), flat AS (
  SELECT {n_cells}
  FROM ta JOIN tb USING (o_custkey)
)
SELECT CAST({total} AS BIGINT) AS n_paired,
       {d1} AS d_low,
       {d2} AS d_mid,
       {chi2} AS chi2_stat,
       CAST(2 AS INT) AS df,
       CAST(CASE WHEN {chi2} > {SM_CHI2_CRIT_DF2} THEN 1 ELSE 0 END AS INT)
         AS significant_5pct
FROM flat
"""


# ---------------------------------------------------------------------------
# Dixon's Q small-sample outlier test (round 10 wave 11)
# ---------------------------------------------------------------------------

DIXON_YEAR = 1997
# Dixon r10 two-sided 95% critical value for n = 25 (Rorabacher 1991)
DIXON_Q_CRIT_N25 = 0.317
DIXON_N = 25  # the nation frame size the literal critical value binds to


def q_dixon_q_outlier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dixon's Q test on the 25-nation annual revenue frame: is the TOP
    nation's revenue a statistical outlier among its peers? Q = (x₍₁₎ −
    x₍₂₎)/(x₍₁₎ − x₍ₙ₎) — the gap-over-range test built for SMALL
    samples, which is exactly the regime the nation/region dimension
    frames live in (``grubbs_statistic`` assumes near-normality and
    n ≳ 30; Dixon is the standard alternative below that). The literal
    critical value is the n = 25 two-sided 95% entry (Rorabacher 1991)
    and the query ASSERTS the frame size matches — a schema change
    fails loudly instead of silently mis-testing (the kendalls_w
    lesson from the round-9 ADVICE).

    Exactness: revenues are exact integer cents; Q is one division of
    integer differences (NULL on both engines in the degenerate
    all-equal frame, x₍₁₎ = x₍ₙ₎); significance is a rational
    comparison. Scale
    shape: one data-sized orders⋈customer hash agg to 25 rows, then a
    global sort-window on the domain-sized frame."""
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    nation = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    rev = (
        orders.filter(F.year("o_orderdate") == DIXON_YEAR)
        .join(cust, orders["o_custkey"] == cust["c_custkey"])
        .groupBy("c_nationkey")
        .agg(
            F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("bigint"))
            .cast("long")
            .alias("cents")
        )
    )
    grid = nation.join(rev, nation["n_nationkey"] == rev["c_nationkey"], "left").select(
        "n_name", F.coalesce(F.col("cents"), F.lit(0)).cast("long").alias("cents")
    )
    w = Window.orderBy(F.col("cents").desc(), F.col("n_name").asc())
    ranked = grid.select(
        "n_name", "cents", F.row_number().over(w).alias("rn")
    )
    agg = ranked.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.max(F.when(F.col("rn") == 1, F.col("n_name"))).alias("top_nation"),
        F.max(F.when(F.col("rn") == 1, F.col("cents"))).cast("long").alias("x1"),
        F.max(F.when(F.col("rn") == 2, F.col("cents"))).cast("long").alias("x2"),
        F.min("cents").cast("long").alias("xn"),
    )
    q = (F.col("x1") - F.col("x2")).cast("double") / (
        F.col("x1") - F.col("xn")
    ).cast("double")
    return agg.select(
        "n",
        "top_nation",
        q.alias("q_stat"),
        F.lit(DIXON_Q_CRIT_N25).alias("q_crit_95"),
        F.when(
            F.col("n") == DIXON_N, (q > F.lit(DIXON_Q_CRIT_N25)).cast("int")
        ).alias("is_outlier_5pct"),  # NULL if the frame size ever drifts
    )


_ORACLE_DIXON = f"""
WITH rev AS (
  SELECT c_nationkey, CAST(SUM(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT) AS cents
  FROM orders JOIN customer ON o_custkey = c_custkey
  WHERE year(o_orderdate) = {DIXON_YEAR}
  GROUP BY 1
), grid AS (
  SELECT n_name, CAST(COALESCE(rev.cents, 0) AS BIGINT) AS cents
  FROM nation LEFT JOIN rev ON n_nationkey = c_nationkey
), ranked AS (
  SELECT n_name, cents,
         ROW_NUMBER() OVER (ORDER BY cents DESC, n_name ASC) AS rn
  FROM grid
), agg AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         MAX(CASE WHEN rn = 1 THEN n_name END) AS top_nation,
         CAST(MAX(CASE WHEN rn = 1 THEN cents END) AS BIGINT) AS x1,
         CAST(MAX(CASE WHEN rn = 2 THEN cents END) AS BIGINT) AS x2,
         CAST(MIN(cents) AS BIGINT) AS xn
  FROM ranked
)
SELECT n, top_nation,
       CAST(x1 - x2 AS DOUBLE) / CAST(x1 - xn AS DOUBLE) AS q_stat,
       CAST({DIXON_Q_CRIT_N25} AS DOUBLE) AS q_crit_95,
       CASE WHEN n = {DIXON_N}
            THEN CAST(CASE WHEN CAST(x1 - x2 AS DOUBLE) / CAST(x1 - xn AS DOUBLE)
                           > {DIXON_Q_CRIT_N25} THEN 1 ELSE 0 END AS INT)
       END AS is_outlier_5pct
FROM agg
"""


# ---------------------------------------------------------------------------
# Odds-ratio / chi-square feature binning — round 11 wave
# ---------------------------------------------------------------------------

ORB_BINS = 10  # literal decile-bin count


def q_odds_ratio_binning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Odds-ratio profile of order value against fulfilment
    (o_orderstatus = 'F'): the credit-scoring feature diagnostic in its
    TRANSCENDENTAL-FREE form — per decile bin b the odds ratio
    OR_b = (g_b·B)/(b_b·G) is exactly exp(WOE_b) (the weight of
    evidence's monotone-equivalent exact rational: the repo bans
    engine-side ln, tests/test_numeric_portability.py), the lift
    g_b·N/((g_b+b_b)·G) reads class concentration directly, and the
    per-bin χ² contribution (g−E_g)²/E_g + (b−E_b)²/E_b replaces the
    IV decomposition as the additive feature-strength score (χ²
    feature selection — Σ over bins is the binned-table χ²). The
    monotone-readable sibling of ``gini_split_gain`` (one best cut)
    and ``model_gains_lift`` (score deciles on a fitted model): this
    bins the RAW feature, no model needed.

    Exactness: bins are the EXACT equal-count decile partition of the
    distinct-value frame — bin(v) = ⌊{b}·t_v/N⌋ with t_v the
    strictly-before pooled count (the krippendorff convention), so bin
    membership is integer arithmetic; per-bin class counts are
    integers, and every output is one IEEE ×/÷ sequence on four exact
    integers. Degenerate guard: a bin with zero goods or zero bads
    emits NULL odds_ratio (the WOE-undefined case); χ² contributions
    stay defined as long as both classes exist globally.

    Scale shape: one hash agg to the distinct-value frame, the
    ``_cum_prev`` bucketed cumulative (r14 optimization), one
    {b}-row agg."""
    orders = load_table(spark, sf_dir, "orders")
    per_v = (
        orders.select(
            F.col("o_totalprice").alias("v"),
            F.when(F.col("o_orderstatus") == "F", F.lit(1))
            .otherwise(F.lit(0))
            .alias("good"),
        )
        .groupBy("v")
        .agg(
            F.sum("good").cast("long").alias("g"),
            F.sum(F.lit(1) - F.col("good")).cast("long").alias("b"),
        )
    )
    tot = per_v.agg(
        F.sum(F.col("g") + F.col("b")).cast("long").alias("n"),
        F.sum("g").cast("long").alias("gt"),
        F.sum("b").cast("long").alias("bt"),
    )
    binned = (
        _cum_prev(per_v, ["v"], {"_t": F.col("g") + F.col("b")}, materialize=True)
        .select(
            "g",
            "b",
            F.col("_t").cast("long").alias("t"),
        )
        .crossJoin(F.broadcast(tot))
        .select(
            # integer floor-division (div), never long/long `/`: the IEEE
            # quotient can double-round across an integer boundary once
            # 10*t exceeds 2^53, while the oracle's `//` is exact (r11
            # ADVICE; same convention as graph.py's fixed-point paths)
            F.expr(f"CAST(({ORB_BINS} * t) div n AS INT)").alias("bin"),
            "g",
            "b",
            "n",
            "gt",
            "bt",
        )
    )
    per_bin = binned.groupBy("bin").agg(
        F.sum("g").cast("long").alias("n_good"),
        F.sum("b").cast("long").alias("n_bad"),
        F.max("n").alias("n"),
        F.max("gt").alias("gt"),
        F.max("bt").alias("bt"),
    )
    gd = F.col("n_good").cast("double")
    bd = F.col("n_bad").cast("double")
    nd = F.col("n").cast("double")
    gtd = F.col("gt").cast("double")
    btd = F.col("bt").cast("double")
    ok = (F.col("n_good") > 0) & (F.col("n_bad") > 0)
    odds = (gd * btd) / (bd * gtd)
    lift = gd * nd / ((gd + bd) * gtd)
    e_g = (gd + bd) * gtd / nd
    e_b = (gd + bd) * btd / nd
    chi2 = (gd - e_g) * (gd - e_g) / e_g + (bd - e_b) * (bd - e_b) / e_b
    return (
        per_bin.select(
            "bin",
            "n_good",
            "n_bad",
            F.when(ok, odds).alias("odds_ratio"),
            lift.alias("lift"),
            chi2.alias("chi2_contrib"),
        )
        .orderBy("bin")
    )
q_odds_ratio_binning.__doc__ = q_odds_ratio_binning.__doc__ and q_odds_ratio_binning.__doc__.format(b=ORB_BINS)


_ORACLE_ODDS_RATIO_BINNING = f"""
WITH per_v AS (
  SELECT o_totalprice AS v,
         CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS g,
         CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 0 ELSE 1 END) AS BIGINT) AS b
  FROM orders GROUP BY 1
), tot AS (
  SELECT CAST(SUM(g + b) AS BIGINT) AS n,
         CAST(SUM(g) AS BIGINT) AS gt, CAST(SUM(b) AS BIGINT) AS bt
  FROM per_v
), binned AS (
  SELECT CAST({ORB_BINS} * COALESCE(SUM(g + b) OVER (ORDER BY v
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) // n AS INT) AS bin,
         g, b, n, gt, bt
  FROM per_v CROSS JOIN tot
), per_bin AS (
  SELECT bin, CAST(SUM(g) AS BIGINT) AS n_good, CAST(SUM(b) AS BIGINT) AS n_bad,
         MAX(n) AS n, MAX(gt) AS gt, MAX(bt) AS bt
  FROM binned GROUP BY 1
), d AS (
  SELECT bin, n_good, n_bad,
         CAST(n_good AS DOUBLE) AS gd, CAST(n_bad AS DOUBLE) AS bd,
         CAST(n AS DOUBLE) AS nd, CAST(gt AS DOUBLE) AS gtd,
         CAST(bt AS DOUBLE) AS btd
  FROM per_bin
)
SELECT bin, n_good, n_bad,
       CASE WHEN n_good > 0 AND n_bad > 0
            THEN (gd * btd) / (bd * gtd) END AS odds_ratio,
       gd * nd / ((gd + bd) * gtd) AS lift,
       (gd - (gd + bd) * gtd / nd) * (gd - (gd + bd) * gtd / nd)
         / ((gd + bd) * gtd / nd)
       + (bd - (bd + gd) * btd / nd) * (bd - (bd + gd) * btd / nd)
         / ((bd + gd) * btd / nd) AS chi2_contrib
FROM d
ORDER BY bin
"""


# ---------------------------------------------------------------------------
# Propensity-style covariate balance (standardized mean differences)
# ---------------------------------------------------------------------------

SMD_SEGMENT = "BUILDING"  # literal "treatment" segment
SMD_BALANCE_THRESH = 0.1  # the |SMD| <= 0.1 balance rule of thumb — literal


def q_propensity_smd_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Covariate-balance table for the {seg}-segment "treatment" cohort:
    the standardized mean difference SMD = (μ_t − μ_c)/√((s²_t +
    s²_c)/2) per customer covariate (account balance, order count,
    total spend) with the |SMD| ≤ {th} balance flag — the table every
    observational study prints BEFORE trusting a between-cohort
    comparison (``ab_srm_check`` validates assignment counts; this
    validates assignment COMPOSITION; ``ab_cuped`` then adjusts).

    Exactness: all three covariates are exact integers per customer
    (cents, counts); per-group Σx and Σx² accumulate in DECIMAL(38,0)
    (order-free; spend² reaches ~10²⁷ at 10⁹ customers), so means,
    sample variances, and each SMD are one IEEE sequence on exact
    integer moments. Degenerate guard: a zero pooled variance emits
    NULL smd/flag.

    Scale shape: one orders hash agg (the only fact-sized stage), one
    broadcast-joined customer frame, a 1-row 14-column moment agg, a
    3-row literal explode."""
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey",
        F.round(F.col("c_acctbal") * 100, 0).cast("long").alias("bal_cents"),
        (F.col("c_mktsegment") == SMD_SEGMENT).cast("int").alias("treat"),
    )
    per_cust = (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_orders"),
            F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("bigint"))
            .cast("long")
            .alias("spend_cents"),
        )
    )
    base = cust.join(
        per_cust, cust["c_custkey"] == per_cust["o_custkey"], "left"
    ).select(
        "treat",
        "bal_cents",
        F.coalesce(F.col("n_orders"), F.lit(0)).cast("long").alias("n_orders"),
        F.coalesce(F.col("spend_cents"), F.lit(0)).cast("long").alias("spend_cents"),
    )
    covs = ["bal_cents", "n_orders", "spend_cents"]

    def dec(c):
        return c.cast("decimal(38,0)")

    aggs = [
        F.sum("treat").cast("long").alias("nt"),
        F.sum(F.lit(1) - F.col("treat")).cast("long").alias("nc"),
    ]
    for c in covs:
        x = F.col(c)
        t = F.col("treat") == 1
        aggs += [
            F.sum(F.when(t, dec(x)).otherwise(F.lit(0).cast("decimal(38,0)")))
            .cast("decimal(38,0)")
            .alias(f"st_{c}"),
            F.sum(F.when(t, dec(x) * dec(x)).otherwise(F.lit(0).cast("decimal(38,0)")))
            .cast("decimal(38,0)")
            .alias(f"st2_{c}"),
            F.sum(F.when(~t, dec(x)).otherwise(F.lit(0).cast("decimal(38,0)")))
            .cast("decimal(38,0)")
            .alias(f"sc_{c}"),
            F.sum(F.when(~t, dec(x) * dec(x)).otherwise(F.lit(0).cast("decimal(38,0)")))
            .cast("decimal(38,0)")
            .alias(f"sc2_{c}"),
        ]
    mom = base.agg(*aggs)
    ntd = F.col("nt").cast("double")
    ncd = F.col("nc").cast("double")
    structs = []
    for c in covs:
        mt = F.col(f"st_{c}").cast("double") / ntd
        mc = F.col(f"sc_{c}").cast("double") / ncd
        vt = (
            F.col(f"st2_{c}").cast("double")
            - F.col(f"st_{c}").cast("double") * F.col(f"st_{c}").cast("double") / ntd
        ) / (ntd - F.lit(1.0))
        vc = (
            F.col(f"sc2_{c}").cast("double")
            - F.col(f"sc_{c}").cast("double") * F.col(f"sc_{c}").cast("double") / ncd
        ) / (ncd - F.lit(1.0))
        pooled = (vt + vc) / F.lit(2.0)
        smd = (mt - mc) / F.sqrt(pooled)
        structs.append(
            F.struct(
                F.lit(c).alias("covariate"),
                mt.alias("mean_treat"),
                mc.alias("mean_ctrl"),
                F.when(pooled > 0, smd).alias("smd"),
                F.when(
                    pooled > 0,
                    (F.abs(smd) <= F.lit(SMD_BALANCE_THRESH)).cast("int"),
                ).alias("balanced"),
            )
        )
    return (
        mom.select("nt", "nc", F.explode(F.array(*structs)).alias("p"))
        .select(
            F.col("p.covariate").alias("covariate"),
            F.col("nt").alias("n_treat"),
            F.col("nc").alias("n_ctrl"),
            F.col("p.mean_treat").alias("mean_treat"),
            F.col("p.mean_ctrl").alias("mean_ctrl"),
            F.col("p.smd").alias("smd"),
            F.col("p.balanced").alias("balanced"),
        )
        .orderBy("covariate")
    )
q_propensity_smd_balance.__doc__ = q_propensity_smd_balance.__doc__ and q_propensity_smd_balance.__doc__.format(seg=SMD_SEGMENT, th=SMD_BALANCE_THRESH)


def _sql_smd_balance() -> str:
    covs = ["bal_cents", "n_orders", "spend_cents"]
    moments = ", ".join(
        f"CAST(SUM(CASE WHEN treat = 1 THEN CAST({c} AS DECIMAL(38,0)) ELSE 0 END) AS DECIMAL(38,0)) AS st_{c},"
        f" CAST(SUM(CASE WHEN treat = 1 THEN CAST({c} AS DECIMAL(38,0)) * CAST({c} AS DECIMAL(38,0)) ELSE 0 END) AS DECIMAL(38,0)) AS st2_{c},"
        f" CAST(SUM(CASE WHEN treat = 0 THEN CAST({c} AS DECIMAL(38,0)) ELSE 0 END) AS DECIMAL(38,0)) AS sc_{c},"
        f" CAST(SUM(CASE WHEN treat = 0 THEN CAST({c} AS DECIMAL(38,0)) * CAST({c} AS DECIMAL(38,0)) ELSE 0 END) AS DECIMAL(38,0)) AS sc2_{c}"
        for c in covs
    )

    def arm(c):
        mt = f"(CAST(st_{c} AS DOUBLE) / CAST(nt AS DOUBLE))"
        mc = f"(CAST(sc_{c} AS DOUBLE) / CAST(nc AS DOUBLE))"
        vt = (
            f"((CAST(st2_{c} AS DOUBLE) - CAST(st_{c} AS DOUBLE) * CAST(st_{c} AS DOUBLE)"
            f" / CAST(nt AS DOUBLE)) / (CAST(nt AS DOUBLE) - 1.0))"
        )
        vc = (
            f"((CAST(sc2_{c} AS DOUBLE) - CAST(sc_{c} AS DOUBLE) * CAST(sc_{c} AS DOUBLE)"
            f" / CAST(nc AS DOUBLE)) / (CAST(nc AS DOUBLE) - 1.0))"
        )
        pooled = f"(({vt} + {vc}) / 2.0)"
        smd = f"(({mt} - {mc}) / sqrt({pooled}))"
        return (
            f"SELECT '{c}' AS covariate, nt AS n_treat, nc AS n_ctrl,"
            f" {mt} AS mean_treat, {mc} AS mean_ctrl,"
            f" CASE WHEN {pooled} > 0 THEN {smd} END AS smd,"
            f" CAST(CASE WHEN {pooled} > 0 THEN"
            f" CASE WHEN ABS({smd}) <= {SMD_BALANCE_THRESH} THEN 1 ELSE 0 END END AS INT)"
            f" AS balanced FROM mom"
        )

    arms = " UNION ALL ".join(arm(c) for c in covs)
    return f"""
WITH per_cust AS (
  SELECT o_custkey, CAST(COUNT(*) AS BIGINT) AS n_orders,
         CAST(SUM(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT) AS spend_cents
  FROM orders GROUP BY 1
), base AS (
  SELECT CASE WHEN c_mktsegment = '{SMD_SEGMENT}' THEN 1 ELSE 0 END AS treat,
         CAST(round(c_acctbal * 100, 0) AS BIGINT) AS bal_cents,
         CAST(COALESCE(n_orders, 0) AS BIGINT) AS n_orders,
         CAST(COALESCE(spend_cents, 0) AS BIGINT) AS spend_cents
  FROM customer LEFT JOIN per_cust ON c_custkey = o_custkey
), mom AS (
  SELECT CAST(SUM(treat) AS BIGINT) AS nt,
         CAST(SUM(1 - treat) AS BIGINT) AS nc,
         {moments}
  FROM base
)
{arms}
ORDER BY covariate
"""


# ---------------------------------------------------------------------------
# Somers' D (round 12)
# ---------------------------------------------------------------------------

# literal order-value bands (ordinal 0..3) — data-independent cut points,
# so band membership is a pure comparison on both engines
_SOMERS_BANDS = [100000, 200000, 300000]


def _somers_band():
    v = F.col("o_totalprice")
    e = F.lit(len(_SOMERS_BANDS))
    for i, cut in enumerate(reversed(_SOMERS_BANDS)):
        e = F.when(v < cut, F.lit(len(_SOMERS_BANDS) - 1 - i)).otherwise(e)
    return e


def q_somers_d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Somers' D between order PRIORITY (ordinal 1..5) and order VALUE
    BAND (ordinal 0..3 by literal cut points) — the ASYMMETRIC ordinal
    association measure: d_yx conditions the concordance difference on
    pairs that differ in X, which is what a predictive claim ("does
    priority predict value band?") actually needs, unlike the symmetric
    ``kendall_tau`` / ``goodman_kruskal_gamma`` (gamma additionally
    throws ALL ties away — Somers' D penalizes ties on the dependent
    side, so d_yx ≤ γ always, and the gap is the tie mass). Reports
    BOTH directions (d_yx, d_xy) plus the shared pair decomposition.

    Exact pair counting on the ≤20-cell contingency grid (one hash agg;
    C/D/tie products are DECIMAL(38,0), ~10²⁴ at 100 TB): C and D from
    the xa<xb cell cross as in gamma; T_y (tied on Y, differing on X)
    from the same cross with ya=yb; T_x from the xa=xb, ya<yb cross.
    d_yx = (C−D)/(C+D+T_y), d_xy = (C−D)/(C+D+T_x) — one division
    each, NULL when the denominator is zero (constant column).
    Scale shape: one hash agg to ≤20 rows, then cell arithmetic.

    Reference analog: none (engine addition, SURVEY.md §2.7)."""
    orders = load_table(spark, sf_dir, "orders").select(
        F.substring("o_orderpriority", 1, 1).cast("int").alias("xo"),
        _somers_band().cast("int").alias("yo"),
    )
    cells = orders.groupBy("xo", "yo").agg(
        F.count(F.lit(1)).cast("decimal(38,0)").alias("cnt")
    )
    a = cells.select(
        F.col("xo").alias("xa"), F.col("yo").alias("ya"), F.col("cnt").alias("na")
    )
    b = cells.select(
        F.col("xo").alias("xb"), F.col("yo").alias("yb"), F.col("cnt").alias("nb")
    )
    zero = F.lit(0).cast("decimal(38,0)")
    cross_x = a.join(F.broadcast(b), F.col("xa") < F.col("xb"))
    agg_x = cross_x.agg(
        F.sum(
            F.when(F.col("ya") < F.col("yb"), F.col("na") * F.col("nb")).otherwise(
                zero
            )
        ).alias("c_pairs"),
        F.sum(
            F.when(F.col("ya") > F.col("yb"), F.col("na") * F.col("nb")).otherwise(
                zero
            )
        ).alias("d_pairs"),
        F.sum(
            F.when(F.col("ya") == F.col("yb"), F.col("na") * F.col("nb")).otherwise(
                zero
            )
        ).alias("ty_pairs"),
    )
    cross_y = a.join(
        F.broadcast(b), (F.col("xa") == F.col("xb")) & (F.col("ya") < F.col("yb"))
    )
    agg_y = cross_y.agg(
        F.coalesce(F.sum(F.col("na") * F.col("nb")), zero).alias("tx_pairs")
    )
    out = agg_x.crossJoin(F.broadcast(agg_y))
    c = F.col("c_pairs").cast("double")
    d = F.col("d_pairs").cast("double")
    ty = F.col("ty_pairs").cast("double")
    tx = F.col("tx_pairs").cast("double")
    return out.select(
        c.alias("concordant"),
        d.alias("discordant"),
        ty.alias("tied_y_only"),
        tx.alias("tied_x_only"),
        F.when(c + d + ty > 0, (c - d) / (c + d + ty))
        .otherwise(F.lit(None).cast("double"))
        .alias("d_yx"),
        F.when(c + d + tx > 0, (c - d) / (c + d + tx))
        .otherwise(F.lit(None).cast("double"))
        .alias("d_xy"),
    )


def _sql_somers_band() -> str:
    e = f"{len(_SOMERS_BANDS)}"
    for i, cut in enumerate(reversed(_SOMERS_BANDS)):
        e = f"CASE WHEN o_totalprice < {cut} THEN {len(_SOMERS_BANDS) - 1 - i} ELSE {e} END"
    return e


_ORACLE_SOMERS_D = f"""
WITH cells AS (
  SELECT CAST(substr(o_orderpriority, 1, 1) AS INT) AS xo,
         CAST({_sql_somers_band()} AS INT) AS yo,
         CAST(COUNT(*) AS DECIMAL(38,0)) AS cnt
  FROM orders GROUP BY 1, 2
), agg_x AS (
  SELECT SUM(CASE WHEN a.yo < b.yo THEN a.cnt * b.cnt ELSE CAST(0 AS DECIMAL(38,0)) END) AS c_pairs,
         SUM(CASE WHEN a.yo > b.yo THEN a.cnt * b.cnt ELSE CAST(0 AS DECIMAL(38,0)) END) AS d_pairs,
         SUM(CASE WHEN a.yo = b.yo THEN a.cnt * b.cnt ELSE CAST(0 AS DECIMAL(38,0)) END) AS ty_pairs
  FROM cells a JOIN cells b ON a.xo < b.xo
), agg_y AS (
  SELECT COALESCE(SUM(a.cnt * b.cnt), CAST(0 AS DECIMAL(38,0))) AS tx_pairs
  FROM cells a JOIN cells b ON a.xo = b.xo AND a.yo < b.yo
), fin AS (
  SELECT CAST(c_pairs AS DOUBLE) AS c, CAST(d_pairs AS DOUBLE) AS d,
         CAST(ty_pairs AS DOUBLE) AS ty, CAST(tx_pairs AS DOUBLE) AS tx
  FROM agg_x CROSS JOIN agg_y
)
SELECT c AS concordant, d AS discordant, ty AS tied_y_only, tx AS tied_x_only,
       CASE WHEN c + d + ty > 0 THEN (c - d) / (c + d + ty) END AS d_yx,
       CASE WHEN c + d + tx > 0 THEN (c - d) / (c + d + tx) END AS d_xy
FROM fin
"""


# ---------------------------------------------------------------------------
# Expected calibration error (round 12)
# ---------------------------------------------------------------------------

ECE_TRAIN_PCT = 80  # md5(custkey) % 100 < 80 — the target_encode split
ECE_BINS = 20
# predicted probability carried as the INTEGER floor(p̂·10^9) — a scaled
# BIGINT, never a decimal fraction (decimal division's engine-specific
# scale rules would silently re-round it); 1e-9 quantization, and every
# downstream sum stays an exact integer < 2^63 through sf100
ECE_P_SCALE = 9


def q_calibration_ece(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Expected calibration error of a leak-safe segment-rate classifier:
    train fold (the ``target_encode_smoothed``/``split_assign`` md5
    split) fits p̂(segment) = P(order is urgent | mktsegment); the TEST
    fold scores ECE = Σ_b (n_b/N)·|acc_b − conf_b| over {ECE_BINS}
    equal-width probability bins, plus the max per-bin gap — the
    model-quality metric ``brier_decomposition`` (which measures the
    same reliability as a variance term) and ``model_gains_lift``
    (ranking) don't give: is the SCORE itself honest as a probability?
    This is the eval-harness staple for LLM/classifier confidence
    auditing.

    Determinism/exactness: the fold assignment is the RNG-free md5
    bucket; p̂ is ONE IEEE division of exact integers (identical on
    both engines), then carried as the INTEGER floor(p̂·10^{ECE_P_SCALE})
    (the ``fsum`` floor convention — a scaled BIGINT, never a decimal
    fraction, because decimal division's engine-specific result-scale
    rules would silently re-round it); the bin index is pure integer
    division on that scaled value; acc sums are exact integers.
    Per-bin |acc−conf| gaps are single IEEE expressions on exact
    scalars. Segments collapse to ≤5 rows before any of this, so the
    'per-bin' frame is ≤5 rows regardless of data size.

    Degenerate contract: an empty test fold or empty train segment
    drops out via inner-join semantics; if NO test rows exist the
    result is one row of NULLs (guarded aggregate over zero rows).

    Scale shape: one fact⋈dim join + two segment-sized hash aggs; the
    scored table never exceeds |segments| rows.

    Reference analog: none (engine addition, SURVEY.md §2.7)."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey",
        F.when(F.col("o_orderpriority") == "1-URGENT", F.lit(1))
        .otherwise(F.lit(0))
        .alias("y"),
    )
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    joined = orders.join(
        F.broadcast(cust), orders["o_custkey"] == cust["c_custkey"]
    ).withColumn(
        "_b",
        F.conv(
            F.substring(F.md5(F.col("o_custkey").cast("string")), 1, 15), 16, 10
        ).cast("bigint")
        % 100,
    )
    train = joined.filter(F.col("_b") < ECE_TRAIN_PCT)
    test = joined.filter(F.col("_b") >= ECE_TRAIN_PCT)
    rate = train.groupBy(F.col("c_mktsegment").alias("seg")).agg(
        F.sum("y").cast("long").alias("n_urgent"),
        F.count(F.lit(1)).cast("long").alias("n_train"),
    )
    q = float(10**ECE_P_SCALE)
    rate = rate.select(
        "seg",
        F.floor(
            F.col("n_urgent").cast("double")
            / F.col("n_train").cast("double")
            * F.lit(q)
        )
        .cast("long")
        .alias("pnum"),
    )
    per_seg = test.groupBy(F.col("c_mktsegment").alias("seg")).agg(
        F.count(F.lit(1)).cast("long").alias("n_test"),
        F.sum("y").cast("long").alias("sum_y"),
    )
    scored = per_seg.join(F.broadcast(rate), "seg")
    per_bin = scored.groupBy(
        F.least(
            F.lit(ECE_BINS - 1),
            F.expr(f"({ECE_BINS} * pnum) div {10**ECE_P_SCALE}").cast("int"),
        ).alias("bin")
    ).agg(
        F.sum("n_test").cast("long").alias("n_b"),
        F.sum("sum_y").cast("long").alias("y_b"),
        F.sum(F.col("pnum").cast("decimal(38,0)") * F.col("n_test"))
        .cast("decimal(38,0)")
        .alias("p_b"),
    )
    gap = F.abs(
        F.col("y_b").cast("double") / F.col("n_b").cast("double")
        - F.col("p_b").cast("double") / (F.col("n_b").cast("double") * F.lit(q))
    )
    out = per_bin.agg(
        F.sum("n_b").cast("long").alias("n_test"),
        F.count(F.lit(1)).cast("int").alias("n_bins_used"),
        fsum(gap * F.col("n_b").cast("double"), scale=9).alias("_wg"),
        F.max(gap).alias("max_ce"),
    )
    return out.select(
        "n_test",
        "n_bins_used",
        (F.col("_wg") / F.col("n_test").cast("double")).alias("ece"),
        "max_ce",
    )


_ORACLE_ECE = f"""
WITH joined AS (
  SELECT o_custkey, c_mktsegment AS seg,
         CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END AS y,
         ({_sql_hex_to_int("md5(CAST(o_custkey AS VARCHAR))", 1, 15)} % 100) AS _b
  FROM orders JOIN customer ON o_custkey = c_custkey
), rate AS (
  SELECT seg,
         CAST(FLOOR(CAST(SUM(y) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) * 1e{ECE_P_SCALE}) AS BIGINT) AS pnum
  FROM joined WHERE _b < {ECE_TRAIN_PCT} GROUP BY 1
), per_seg AS (
  SELECT seg, CAST(COUNT(*) AS BIGINT) AS n_test, CAST(SUM(y) AS BIGINT) AS sum_y
  FROM joined WHERE _b >= {ECE_TRAIN_PCT} GROUP BY 1
), scored AS (
  SELECT s.n_test, s.sum_y, r.pnum FROM per_seg s JOIN rate r ON s.seg = r.seg
), per_bin AS (
  SELECT LEAST({ECE_BINS - 1}, CAST(({ECE_BINS} * pnum) // {10**ECE_P_SCALE} AS INT)) AS bin,
         CAST(SUM(n_test) AS BIGINT) AS n_b,
         CAST(SUM(sum_y) AS BIGINT) AS y_b,
         CAST(SUM(CAST(pnum AS DECIMAL(38,0)) * n_test) AS DECIMAL(38,0)) AS p_b
  FROM scored GROUP BY 1
), gaps AS (
  SELECT n_b, ABS(CAST(y_b AS DOUBLE) / CAST(n_b AS DOUBLE)
                  - CAST(p_b AS DOUBLE) / (CAST(n_b AS DOUBLE) * 1e{ECE_P_SCALE})) AS gap
  FROM per_bin
)
SELECT CAST(SUM(n_b) AS BIGINT) AS n_test,
       CAST(COUNT(*) AS INT) AS n_bins_used,
       {sql_fsum("gap * CAST(n_b AS DOUBLE)", scale=9)}
         / CAST(SUM(n_b) AS DOUBLE) AS ece,
       MAX(gap) AS max_ce
FROM gaps
"""


# ---------------------------------------------------------------------------
# DeLong standard error of the AUC (round 13)
# ---------------------------------------------------------------------------

_DELONG_Z = 1.959963984540054


def q_auc_delong_se(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROC AUC with its DeLong standard error and 95% Wald CI — the
    inference companion of ``roc_auc_exact`` (same score/label): DeLong
    et al. (1988) express AUC as a two-sample U-statistic whose
    variance is estimable from the per-observation PLACEMENT values
    V₁₀(positive) = fraction of negatives it outranks (ties ½) and
    V₀₁(negative) symmetric, giving SE² = S₁₀/n₁ + S₀₁/n₀ — the number
    that turns 'AUC 0.71' into 'AUC 0.71 ± 0.01', and the basis of the
    standard correlated-ROC comparison test.

    Exactness: doubled placements per tied value group are exact
    integers (the ``brunner_munzel_test`` midrank identity: for a
    positive, p = 2·(negatives below) + (negatives tied)); Σc·p and
    Σc·p² per class are exact DECIMAL(38,0) hash sums; the two sample
    variances use the exact numerator n·Σp² − (Σp)² (DECIMAL, limb-
    split conversion) over (2n_opp)²·n(n−1), and AUC/SE/CI are ONE
    fixed IEEE sequence. Degenerate contract: a class with n ≤ 1 or an
    empty class → SE/CI NULL under explicit guards (AUC itself needs
    both classes non-empty).

    Scale shape: identical to roc_auc_exact's per-value frame — one
    value-domain hash agg, the ``_cum_prev`` bucketed cumulative
    (r14 optimization), one 1-row reduce.

    Reference analog: none (engine addition, SURVEY.md §2.7)."""
    orders = load_table(spark, sf_dir, "orders")
    per_v = (
        orders.select(
            F.col("o_totalprice").alias("v"),
            F.when(F.col("o_orderpriority") == "1-URGENT", F.lit(1))
            .otherwise(F.lit(0))
            .alias("g1"),
        )
        .groupBy("v")
        .agg(
            F.sum("g1").cast("long").alias("c1"),
            F.sum(F.lit(1) - F.col("g1")).cast("long").alias("c0"),
        )
    )
    ranked = _cum_prev(
        per_v, ["v"], {"t1": F.col("c1"), "t0": F.col("c0")}, materialize=True
    ).select("c1", "c0", "t1", "t0")

    def dec(c):
        return c.cast("decimal(38,0)")

    p1 = F.lit(2) * F.col("t0") + F.col("c0")  # doubled placement, positives
    p0 = F.lit(2) * F.col("t1") + F.col("c1")  # doubled placement, negatives
    red = ranked.agg(
        F.sum("c1").cast("long").alias("n1"),
        F.sum("c0").cast("long").alias("n0"),
        F.sum(dec(F.col("c1")) * dec(p1)).cast("decimal(38,0)").alias("s1"),
        F.sum(dec(F.col("c1")) * dec(p1) * dec(p1))
        .cast("decimal(38,0)")
        .alias("q1"),
        F.sum(dec(F.col("c0")) * dec(p0)).cast("decimal(38,0)").alias("s0"),
        F.sum(dec(F.col("c0")) * dec(p0) * dec(p0))
        .cast("decimal(38,0)")
        .alias("q0"),
    )
    mid = red.select(
        "n1",
        "n0",
        "s1",
        (dec(F.col("n1")) * F.col("q1") - F.col("s1") * F.col("s1"))
        .cast("decimal(38,0)")
        .alias("v1"),
        (dec(F.col("n0")) * F.col("q0") - F.col("s0") * F.col("s0"))
        .cast("decimal(38,0)")
        .alias("v0"),
    )
    n1d = F.col("n1").cast("double")
    n0d = F.col("n0").cast("double")
    auc = dec_to_double(F.col("s1")) / (F.lit(2.0) * n1d * n0d)
    s10 = dec_to_double(F.col("v1")) / (
        F.lit(4.0) * n0d * n0d * n1d * (n1d - F.lit(1.0))
    )
    s01 = dec_to_double(F.col("v0")) / (
        F.lit(4.0) * n1d * n1d * n0d * (n0d - F.lit(1.0))
    )
    se = F.sqrt(s10 / n1d + s01 / n0d)
    both = (F.col("n1") > 0) & (F.col("n0") > 0)
    ok = (F.col("n1") > 1) & (F.col("n0") > 1)
    return mid.select(
        "n1",
        "n0",
        F.when(both, auc).alias("auc"),
        F.when(ok, se).alias("se_delong"),
        F.when(ok, auc - F.lit(_DELONG_Z) * se).alias("ci95_lo"),
        F.when(ok, auc + F.lit(_DELONG_Z) * se).alias("ci95_hi"),
    )


def _sql_auc_delong() -> str:
    auc = f"({sql_dec_to_double('s1')} / (2.0 * CAST(n1 AS DOUBLE) * CAST(n0 AS DOUBLE)))"
    s10 = (
        f"({sql_dec_to_double('v1')} / (4.0 * CAST(n0 AS DOUBLE) * CAST(n0 AS DOUBLE)"
        f" * CAST(n1 AS DOUBLE) * (CAST(n1 AS DOUBLE) - 1.0)))"
    )
    s01 = (
        f"({sql_dec_to_double('v0')} / (4.0 * CAST(n1 AS DOUBLE) * CAST(n1 AS DOUBLE)"
        f" * CAST(n0 AS DOUBLE) * (CAST(n0 AS DOUBLE) - 1.0)))"
    )
    se = f"sqrt({s10} / CAST(n1 AS DOUBLE) + {s01} / CAST(n0 AS DOUBLE))"
    return f"""
WITH per_v AS (
  SELECT o_totalprice AS v,
         CAST(SUM(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END) AS BIGINT) AS c1,
         CAST(SUM(CASE WHEN o_orderpriority = '1-URGENT' THEN 0 ELSE 1 END) AS BIGINT) AS c0
  FROM orders GROUP BY 1
), ranked AS (
  SELECT c1, c0,
         COALESCE(SUM(c1) OVER (ORDER BY v
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS t1,
         COALESCE(SUM(c0) OVER (ORDER BY v
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS t0
  FROM per_v
), red AS (
  SELECT CAST(SUM(c1) AS BIGINT) AS n1, CAST(SUM(c0) AS BIGINT) AS n0,
         CAST(SUM(CAST(c1 AS DECIMAL(38,0)) * CAST(2 * t0 + c0 AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS s1,
         CAST(SUM(CAST(c1 AS DECIMAL(38,0)) * CAST(2 * t0 + c0 AS DECIMAL(38,0)) * CAST(2 * t0 + c0 AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS q1,
         CAST(SUM(CAST(c0 AS DECIMAL(38,0)) * CAST(2 * t1 + c1 AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS s0,
         CAST(SUM(CAST(c0 AS DECIMAL(38,0)) * CAST(2 * t1 + c1 AS DECIMAL(38,0)) * CAST(2 * t1 + c1 AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS q0
  FROM ranked
), mid AS (
  SELECT n1, n0, s1,
         CAST(CAST(n1 AS DECIMAL(38,0)) * q1 - s1 * s1 AS DECIMAL(38,0)) AS v1,
         CAST(CAST(n0 AS DECIMAL(38,0)) * q0 - s0 * s0 AS DECIMAL(38,0)) AS v0
  FROM red
)
SELECT n1, n0,
       CASE WHEN n1 > 0 AND n0 > 0 THEN {auc} END AS auc,
       CASE WHEN n1 > 1 AND n0 > 1 THEN {se} END AS se_delong,
       CASE WHEN n1 > 1 AND n0 > 1 THEN {auc} - {_DELONG_Z} * {se} END AS ci95_lo,
       CASE WHEN n1 > 1 AND n0 > 1 THEN {auc} + {_DELONG_Z} * {se} END AS ci95_hi
FROM mid
"""


# ---------------------------------------------------------------------------
# Spiegelhalter calibration Z (round 13)
# ---------------------------------------------------------------------------

_SPZ_CRIT = 1.959963984540054


def q_spiegelhalter_z(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spiegelhalter's Z calibration TEST on the ``calibration_ece``
    classifier (leak-safe md5-split segment-rate model, same test
    fold): Z = Σ(yᵢ−pᵢ)(1−2pᵢ) / √(Σ(1−2pᵢ)²pᵢ(1−pᵢ)) — the exact
    decomposition of the Brier score into calibration noise that is
    asymptotically N(0,1) under perfect calibration (Spiegelhalter
    1986). ECE answers 'how big is the miscalibration'; this answers
    the question a binned metric can't: 'is it STATISTICALLY real, or
    within sampling noise of a calibrated model' — with no binning
    knob at all.

    Exactness: pᵢ is constant within a segment, so both sums collapse
    to ≤5 segment terms. The numerator is carried EXACTLY:
    Σ_seg (sum_y·q − n·pnum)·(q − 2·pnum) in DECIMAL(38,0) with
    q = 10^{ECE_P_SCALE} and pnum the scaled-integer rate (one final
    /q² after the limb-split). The denominator's per-segment term
    n·(1−2p)²·p·(1−p) is ONE fixed IEEE expression on exact scalars
    (deterministic on both engines), floor-quantized across the ≤5-row
    segment frame (``fsum`` scale 6 — sum ≤ n/4 stays inside 2^53 far
    past 10^9 test rows). Degenerate contract: a test fold where every
    segment rate is 0, ½ or 1 zeroes the denominator → Z NULL under an
    explicit guard. Additionally, test-fold counts are INNER-joined to
    train-fold segment rates, so a segment whose rows ALL hash into the
    test split (no train rows → no rate) is dropped from the test sum
    and ``n_test`` counts only scoreable rows — rows the model can
    actually emit a pᵢ for — not the full test fold (ADVICE r13 #2;
    both engines share this contract).

    Scale shape: one fact⋈dim join + two segment-sized hash aggs + a
    1-row reduce — identical to calibration_ece.

    Reference analog: none (engine addition, SURVEY.md §2.7)."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey",
        F.when(F.col("o_orderpriority") == "1-URGENT", F.lit(1))
        .otherwise(F.lit(0))
        .alias("y"),
    )
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    joined = orders.join(
        F.broadcast(cust), orders["o_custkey"] == cust["c_custkey"]
    ).withColumn(
        "_b",
        F.conv(
            F.substring(F.md5(F.col("o_custkey").cast("string")), 1, 15), 16, 10
        ).cast("bigint")
        % 100,
    )
    train = joined.filter(F.col("_b") < ECE_TRAIN_PCT)
    test = joined.filter(F.col("_b") >= ECE_TRAIN_PCT)
    q = float(10**ECE_P_SCALE)
    rate = (
        train.groupBy(F.col("c_mktsegment").alias("seg"))
        .agg(
            F.sum("y").cast("long").alias("n_urgent"),
            F.count(F.lit(1)).cast("long").alias("n_train"),
        )
        .select(
            "seg",
            F.floor(
                F.col("n_urgent").cast("double")
                / F.col("n_train").cast("double")
                * F.lit(q)
            )
            .cast("long")
            .alias("pnum"),
        )
    )
    per_seg = test.groupBy(F.col("c_mktsegment").alias("seg")).agg(
        F.count(F.lit(1)).cast("long").alias("n_test"),
        F.sum("y").cast("long").alias("sum_y"),
    )
    scored = per_seg.join(F.broadcast(rate), "seg")

    def dec(c):
        return c.cast("decimal(38,0)")

    qi = 10**ECE_P_SCALE
    num_seg = (
        dec(F.col("sum_y")) * F.lit(qi) - dec(F.col("n_test")) * dec(F.col("pnum"))
    ) * (F.lit(qi) - F.lit(2) * dec(F.col("pnum")))
    p = F.col("pnum").cast("double") / F.lit(q)
    den_seg = (
        F.col("n_test").cast("double")
        * (F.lit(1.0) - F.lit(2.0) * p)
        * (F.lit(1.0) - F.lit(2.0) * p)
        * p
        * (F.lit(1.0) - p)
    )
    red = scored.agg(
        F.sum("n_test").cast("long").alias("n_test"),
        F.count(F.lit(1)).cast("int").alias("n_segments"),
        F.sum(num_seg.cast("decimal(38,0)")).cast("decimal(38,0)").alias("znum"),
        fsum(den_seg, scale=6).alias("zden"),
    )
    z = dec_to_double(F.col("znum")) / (F.lit(q) * F.lit(q)) / F.sqrt(F.col("zden"))
    ok = F.col("zden") > 0
    return red.select(
        "n_test",
        "n_segments",
        F.when(ok, z).alias("z_spiegelhalter"),
        F.when(ok, (F.abs(z) > F.lit(_SPZ_CRIT)).cast("int")).alias(
            "significant_5pct"
        ),
    )


def _sql_spiegelhalter() -> str:
    qi = 10**ECE_P_SCALE
    p = f"(CAST(pnum AS DOUBLE) / 1e{ECE_P_SCALE})"
    den_seg = (
        f"(CAST(n_test AS DOUBLE) * (1.0 - 2.0 * {p}) * (1.0 - 2.0 * {p})"
        f" * {p} * (1.0 - {p}))"
    )
    z = (
        f"({sql_dec_to_double('znum')} / (1e{ECE_P_SCALE} * 1e{ECE_P_SCALE})"
        f" / sqrt(zden))"
    )
    return f"""
WITH joined AS (
  SELECT o_custkey, c_mktsegment AS seg,
         CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END AS y,
         ({_sql_hex_to_int("md5(CAST(o_custkey AS VARCHAR))", 1, 15)} % 100) AS _b
  FROM orders JOIN customer ON o_custkey = c_custkey
), rate AS (
  SELECT seg,
         CAST(FLOOR(CAST(SUM(y) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) * 1e{ECE_P_SCALE}) AS BIGINT) AS pnum
  FROM joined WHERE _b < {ECE_TRAIN_PCT} GROUP BY 1
), per_seg AS (
  SELECT seg, CAST(COUNT(*) AS BIGINT) AS n_test, CAST(SUM(y) AS BIGINT) AS sum_y
  FROM joined WHERE _b >= {ECE_TRAIN_PCT} GROUP BY 1
), scored AS (
  SELECT s.n_test, s.sum_y, r.pnum FROM per_seg s JOIN rate r ON s.seg = r.seg
), red AS (
  SELECT CAST(SUM(n_test) AS BIGINT) AS n_test,
         CAST(COUNT(*) AS INT) AS n_segments,
         CAST(SUM(CAST((CAST(sum_y AS DECIMAL(38,0)) * {qi}
                - CAST(n_test AS DECIMAL(38,0)) * CAST(pnum AS DECIMAL(38,0)))
              * ({qi} - 2 * CAST(pnum AS DECIMAL(38,0))) AS DECIMAL(38,0)))
              AS DECIMAL(38,0)) AS znum,
         {sql_fsum(den_seg, scale=6)} AS zden
  FROM scored
)
SELECT n_test, n_segments,
       CASE WHEN zden > 0 THEN {z} END AS z_spiegelhalter,
       CASE WHEN zden > 0
            THEN CAST(abs({z}) > {_SPZ_CRIT} AS INT) END AS significant_5pct
FROM red
"""


# ---------------------------------------------------------------------------
# Classifier confusion metrics (round 12)
# ---------------------------------------------------------------------------


def q_classifier_confusion_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Confusion-matrix scorecard of the ``calibration_ece`` classifier
    (leak-safe md5-split segment-rate model for 'order is urgent'),
    thresholded at the TRAIN-fold global rate: the deployment-shaped
    eval row every model registry stores — TP/FP/FN/TN, precision,
    recall, F1, balanced accuracy and MCC — completing the
    classifier-eval shelf beside ``roc_auc_exact`` (threshold-free
    ranking), ``brier_decomposition`` (probabilistic loss),
    ``model_gains_lift`` (deciles) and ``calibration_ece`` (probability
    honesty). MCC is the headline: the single confusion scalar that
    stays honest under class imbalance (urgent ≈ 1/5 here), where
    accuracy and even F1 mislead.

    Exactness: the threshold comparison is EXACT integer cross-
    multiplication (segment positive iff urgent_s·n_train >
    urgent·n_train_s — no rate quotient is ever materialized, so no
    quantization enters the decision); confusion cells are integer sums
    over ≤5 segment rows; F1 = 2TP/(2TP+FP+FN) is ONE division; MCC's
    four-factor denominator product reaches N⁴ (> 2^64 at sf1), so
    numerator and denominator go through the portable limb-split before
    the one sqrt + division. Degenerate contracts: each ratio NULL when
    its denominator is 0; MCC NULL when any margin is empty.

    Scale shape: one fact⋈dim join + two segment-sized hash aggs + a
    1-row reduce — identical to calibration_ece.

    Reference analog: none (engine addition, SURVEY.md §2.7)."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey",
        F.when(F.col("o_orderpriority") == "1-URGENT", F.lit(1))
        .otherwise(F.lit(0))
        .alias("y"),
    )
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    joined = orders.join(
        F.broadcast(cust), orders["o_custkey"] == cust["c_custkey"]
    ).withColumn(
        "_b",
        F.conv(
            F.substring(F.md5(F.col("o_custkey").cast("string")), 1, 15), 16, 10
        ).cast("bigint")
        % 100,
    )
    train = joined.filter(F.col("_b") < ECE_TRAIN_PCT)
    test = joined.filter(F.col("_b") >= ECE_TRAIN_PCT)
    rate = train.groupBy(F.col("c_mktsegment").alias("seg")).agg(
        F.sum("y").cast("long").alias("u_s"),
        F.count(F.lit(1)).cast("long").alias("n_s"),
    )
    glob = rate.agg(
        F.sum("u_s").cast("long").alias("u_g"),
        F.sum("n_s").cast("long").alias("n_g"),
    )
    # positive iff the segment's train rate exceeds the global train rate:
    # u_s/n_s > u_g/n_g  ⟺  u_s·n_g > u_g·n_s  (exact integer decision)
    pred = (
        rate.crossJoin(F.broadcast(glob))
        .select(
            "seg",
            (F.col("u_s") * F.col("n_g") > F.col("u_g") * F.col("n_s"))
            .cast("int")
            .alias("pos"),
        )
    )
    per_seg = test.groupBy(F.col("c_mktsegment").alias("seg")).agg(
        F.count(F.lit(1)).cast("long").alias("n_test"),
        F.sum("y").cast("long").alias("sum_y"),
    )
    cells = per_seg.join(F.broadcast(pred), "seg").agg(
        F.sum(F.when(F.col("pos") == 1, F.col("sum_y")).otherwise(0))
        .cast("long")
        .alias("tp"),
        F.sum(
            F.when(F.col("pos") == 1, F.col("n_test") - F.col("sum_y")).otherwise(0)
        )
        .cast("long")
        .alias("fp"),
        F.sum(F.when(F.col("pos") == 0, F.col("sum_y")).otherwise(0))
        .cast("long")
        .alias("fn"),
        F.sum(
            F.when(F.col("pos") == 0, F.col("n_test") - F.col("sum_y")).otherwise(0)
        )
        .cast("long")
        .alias("tn"),
    )

    def dec(c):
        return c.cast("decimal(38,0)")

    tp, fp, fn, tn = (F.col(c) for c in ("tp", "fp", "fn", "tn"))
    tpd, fpd, fnd, tnd = (c.cast("double") for c in (tp, fp, fn, tn))
    prec = F.when(tp + fp > 0, tpd / (tpd + fpd))
    rec = F.when(tp + fn > 0, tpd / (tpd + fnd))
    f1 = F.when(
        F.lit(2) * tp + fp + fn > 0,
        F.lit(2.0) * tpd / (F.lit(2.0) * tpd + fpd + fnd),
    )
    tnr = F.when(tn + fp > 0, tnd / (tnd + fpd))
    bal = (rec + tnr) / F.lit(2.0)
    mcc_num = (dec(tp) * dec(tn) - dec(fp) * dec(fn)).cast("decimal(38,0)")
    mcc_den = (
        dec(tp + fp) * dec(tp + fn) * dec(tn + fp) * dec(tn + fn)
    ).cast("decimal(38,0)")
    mcc = F.when(
        (tp + fp > 0) & (tp + fn > 0) & (tn + fp > 0) & (tn + fn > 0),
        dec_to_double(mcc_num) / F.sqrt(dec_to_double(mcc_den)),
    )
    return cells.select(
        "tp",
        "fp",
        "fn",
        "tn",
        prec.alias("precision"),
        rec.alias("recall"),
        f1.alias("f1"),
        bal.alias("balanced_accuracy"),
        mcc.alias("mcc"),
    )


_ORACLE_CONFUSION = f"""
WITH joined AS (
  SELECT o_custkey, c_mktsegment AS seg,
         CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END AS y,
         ({_sql_hex_to_int("md5(CAST(o_custkey AS VARCHAR))", 1, 15)} % 100) AS _b
  FROM orders JOIN customer ON o_custkey = c_custkey
), rate AS (
  SELECT seg, CAST(SUM(y) AS BIGINT) AS u_s, CAST(COUNT(*) AS BIGINT) AS n_s
  FROM joined WHERE _b < {ECE_TRAIN_PCT} GROUP BY 1
), gtot AS (
  SELECT CAST(SUM(u_s) AS BIGINT) AS u_g, CAST(SUM(n_s) AS BIGINT) AS n_g FROM rate
), pred AS (
  SELECT seg, CASE WHEN u_s * n_g > u_g * n_s THEN 1 ELSE 0 END AS pos
  FROM rate CROSS JOIN gtot
), per_seg AS (
  SELECT seg, CAST(COUNT(*) AS BIGINT) AS n_test, CAST(SUM(y) AS BIGINT) AS sum_y
  FROM joined WHERE _b >= {ECE_TRAIN_PCT} GROUP BY 1
), cells AS (
  SELECT CAST(SUM(CASE WHEN pos = 1 THEN sum_y ELSE 0 END) AS BIGINT) AS tp,
         CAST(SUM(CASE WHEN pos = 1 THEN n_test - sum_y ELSE 0 END) AS BIGINT) AS fp,
         CAST(SUM(CASE WHEN pos = 0 THEN sum_y ELSE 0 END) AS BIGINT) AS fn,
         CAST(SUM(CASE WHEN pos = 0 THEN n_test - sum_y ELSE 0 END) AS BIGINT) AS tn
  FROM per_seg JOIN pred USING (seg)
)
SELECT tp, fp, fn, tn,
       CASE WHEN tp + fp > 0 THEN CAST(tp AS DOUBLE) / (CAST(tp AS DOUBLE) + CAST(fp AS DOUBLE)) END AS precision,
       CASE WHEN tp + fn > 0 THEN CAST(tp AS DOUBLE) / (CAST(tp AS DOUBLE) + CAST(fn AS DOUBLE)) END AS recall,
       CASE WHEN 2 * tp + fp + fn > 0
            THEN 2.0 * CAST(tp AS DOUBLE) / (2.0 * CAST(tp AS DOUBLE) + CAST(fp AS DOUBLE) + CAST(fn AS DOUBLE)) END AS f1,
       ((CASE WHEN tp + fn > 0 THEN CAST(tp AS DOUBLE) / (CAST(tp AS DOUBLE) + CAST(fn AS DOUBLE)) END)
        + (CASE WHEN tn + fp > 0 THEN CAST(tn AS DOUBLE) / (CAST(tn AS DOUBLE) + CAST(fp AS DOUBLE)) END)) / 2.0 AS balanced_accuracy,
       CASE WHEN tp + fp > 0 AND tp + fn > 0 AND tn + fp > 0 AND tn + fn > 0
            THEN {sql_dec_to_double("CAST(CAST(tp AS DECIMAL(38,0)) * CAST(tn AS DECIMAL(38,0)) - CAST(fp AS DECIMAL(38,0)) * CAST(fn AS DECIMAL(38,0)) AS DECIMAL(38,0))")}
                 / sqrt({sql_dec_to_double("CAST(CAST(tp + fp AS DECIMAL(38,0)) * CAST(tp + fn AS DECIMAL(38,0)) * CAST(tn + fp AS DECIMAL(38,0)) * CAST(tn + fn AS DECIMAL(38,0)) AS DECIMAL(38,0))")})
       END AS mcc
FROM cells
"""


# ---------------------------------------------------------------------------
# Goldfeld-Quandt heteroskedasticity test (round 14)
# ---------------------------------------------------------------------------

_GQ_LO_YM = 1996 * 12 + 1   # early window ends BEFORE 1996-01
_GQ_HI_YM = 1997 * 12 + 1   # late window starts AT 1997-01 (1996 omitted)
_GQ_X0 = 1995 * 12          # literal x-origin: keeps the uncentered-moment
# formula well-conditioned — without the shift, the Sx·Sy/n term multiplies
# the y-moments' floor-quantization quantum by x̄ ≈ 2.4e4 and the SSR drifts
# ~3e-4 relative off an exact fit (measured at sf0.001, round 14)


def q_goldfeld_quandt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Goldfeld-Quandt heteroskedasticity test per region on the monthly-
    revenue trend (the ``chow_test`` frame): fit the OLS line separately
    on the EARLY months (before 1996-01) and the LATE months (1997-01
    on), omit the middle year entirely (the classical central-omission
    that sharpens the contrast; Goldfeld & Quandt 1965), and compare
    residual variances — F = (SSR_late/(n2−2)) / (SSR_early/(n1−2)).
    Where ``breusch_pagan_het`` regresses squared residuals on the
    regressor (a LINEAR variance drift test), GQ is the ordering-based
    sibling that needs no auxiliary regression and catches ANY variance
    change between regimes; ``chow_test`` asks if the LINE moved, GQ
    asks if the NOISE did.

    Exactness: both segments' (n, Σx, Σy, Σxy, Σx², Σy²) come from ONE
    conditional-moment hash agg — x is the integer month, y revenue in
    $10M units with floor-quantized y-moments (the chow scales), and
    each SSR is the same computational-formula IEEE sequence on both
    engines (``_ols_moment_cols``). Degenerate contract: a segment with
    n ≤ 2 (SSR df would vanish) or a zero early-segment SSR → F NULL
    under an explicit guard.

    Scale shape: scan → |region|×|month| cells; the moment algebra runs
    on 5 rows.

    Reference analog: none (engine addition, SURVEY.md §2.7)."""
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    monthly = (
        orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy(
            "r_name",
            (F.year("o_orderdate") * 12 + F.month("o_orderdate")).alias("ym"),
        )
        .agg(
            F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("bigint"))
            .cast("long")
            .alias("cents")
        )
        .select(
            "r_name",
            (F.col("ym") - F.lit(_GQ_X0)).alias("x"),
            (F.col("ym") < _GQ_LO_YM).alias("early"),
            (F.col("ym") >= _GQ_HI_YM).alias("late"),
            (F.col("cents").cast("double") / F.lit(_UNIT)).alias("v"),
        )
    )

    def seg(cond, label):
        xd = F.col("x").cast("long")
        return [
            F.sum(F.when(cond, 1).otherwise(0)).cast("long").alias(f"{label}n"),
            F.sum(F.when(cond, xd).otherwise(0)).cast("long").alias(f"{label}sx"),
            fsum(F.when(cond, F.col("v")).otherwise(0.0), scale=_FS).alias(f"{label}sy"),
            fsum(
                F.when(cond, F.col("v") * xd.cast("double")).otherwise(0.0),
                scale=_FS,
            ).alias(f"{label}sxy"),
            F.sum(F.when(cond, xd * xd).otherwise(0)).cast("long").alias(f"{label}sxx"),
            fsum(
                F.when(cond, F.col("v") * F.col("v")).otherwise(0.0), scale=_FS
            ).alias(f"{label}syy"),
        ]

    m = monthly.groupBy("r_name").agg(
        *seg(F.col("early"), "a_"),
        *seg(F.col("late"), "b_"),
    )
    ssr1 = _ols_moment_cols("a_")
    ssr2 = _ols_moment_cols("b_")
    n1 = F.col("a_n").cast("double")
    n2 = F.col("b_n").cast("double")
    ok = (F.col("a_n") > 2) & (F.col("b_n") > 2) & (ssr1 > 0)
    return m.select(
        "r_name",
        F.col("a_n").alias("n_early"),
        F.col("b_n").alias("n_late"),
        F.when(ok, ssr1).alias("ssr_early"),
        F.when(ok, ssr2).alias("ssr_late"),
        F.when(ok, (ssr2 / (n2 - F.lit(2.0))) / (ssr1 / (n1 - F.lit(2.0)))).alias(
            "gq_f"
        ),
    ).orderBy("r_name")


def _sql_goldfeld_quandt() -> str:
    def seg(cond, label):
        return f"""
         CAST(SUM(CASE WHEN {cond} THEN 1 ELSE 0 END) AS BIGINT) AS {label}n,
         CAST(SUM(CASE WHEN {cond} THEN x ELSE 0 END) AS BIGINT) AS {label}sx,
         {sql_fsum(f"CASE WHEN {cond} THEN v ELSE 0.0 END", _FS)} AS {label}sy,
         {sql_fsum(f"CASE WHEN {cond} THEN v * CAST(x AS DOUBLE) ELSE 0.0 END", _FS)} AS {label}sxy,
         CAST(SUM(CASE WHEN {cond} THEN x * x ELSE 0 END) AS BIGINT) AS {label}sxx,
         {sql_fsum(f"CASE WHEN {cond} THEN v * v ELSE 0.0 END", _FS)} AS {label}syy"""

    def ssr(label):
        n = f"CAST({label}n AS DOUBLE)"
        sx = f"CAST({label}sx AS DOUBLE)"
        sxx = f"CAST({label}sxx AS DOUBLE)"
        return (
            f"(({label}syy - {label}sy * {label}sy / {n})"
            f" - ({label}sxy - {sx} * {label}sy / {n})"
            f" * ({label}sxy - {sx} * {label}sy / {n})"
            f" / ({sxx} - {sx} * {sx} / {n}))"
        )

    ok = f"a_n > 2 AND b_n > 2 AND {ssr('a_')} > 0"
    return f"""
WITH monthly AS (
  SELECT r_name,
         CAST(YEAR(o_orderdate) * 12 + MONTH(o_orderdate) - {_GQ_X0} AS BIGINT) AS x,
         YEAR(o_orderdate) * 12 + MONTH(o_orderdate) < {_GQ_LO_YM} AS early,
         YEAR(o_orderdate) * 12 + MONTH(o_orderdate) >= {_GQ_HI_YM} AS late,
         CAST(SUM(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS DOUBLE) / 1e9 AS v
  FROM orders
  JOIN customer ON o_custkey = c_custkey
  JOIN nation ON c_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey
  GROUP BY 1, 2, 3, 4
), m AS (
  SELECT r_name,{seg("early", "a_")},{seg("late", "b_")}
  FROM monthly GROUP BY 1
)
SELECT r_name,
       a_n AS n_early, b_n AS n_late,
       CASE WHEN {ok} THEN {ssr("a_")} END AS ssr_early,
       CASE WHEN {ok} THEN {ssr("b_")} END AS ssr_late,
       CASE WHEN {ok}
            THEN ({ssr("b_")} / (CAST(b_n AS DOUBLE) - 2.0))
                 / ({ssr("a_")} / (CAST(a_n AS DOUBLE) - 2.0)) END AS gq_f
FROM m
ORDER BY r_name
"""


# ---------------------------------------------------------------------------
# KPSS level-stationarity test (round 14)
# ---------------------------------------------------------------------------

_KPSS_X0 = 1992 * 12      # literal month origin (display/join key only)
_KPSS_LAGS = 4            # Bartlett window l = 4 ~ floor(4*(n/100)^(1/4)) at n~84
_KPSS_CRIT_5PCT = 0.463   # Kwiatkowski et al. 1992 table 1, level case — literal


def q_kpss_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KPSS level-stationarity test on the global monthly-revenue series:
    the null here is STATIONARITY (the mirror image of unit-root tests),
    which is what makes it the standard pre-flight for every
    trend/forecast entry in this repo — reject and the mean-reverting
    machinery (``events_theta_forecast``'s SES base, ``autocorr_lag``'s
    interpretation) is suspect. eta = n^-2 * sum_t S_t^2 / s2_lrv with
    S_t the partial sums of demeaned revenue and s2_lrv the Bartlett
    long-run variance gamma0 + 2*sum_j (1 - j/(l+1)) gamma_j at the
    literal l={l} (Kwiatkowski-Phillips-Schmidt-Shin 1992). Fully
    RATIONAL in the series — no logs, no CDFs; significance compares
    against the literal 5% table value {c} (asymptotic, documented).

    Exactness: monthly revenue is an exact integer-cents agg scaled to
    $10M units; the mean is a floor-quantized sum over one IEEE
    division; demeaned terms are floor-quantized to exact 1e-9 integers
    so every partial sum S_t is EXACT integer arithmetic under the
    cumulative window (no running-sum accumulation-order hazard);
    sum S_t^2 and each autocovariance are floor-quantized reduces; the
    Bartlett weights are literal rationals. Degenerate contract: a zero
    long-run variance (constant series) -> statistic NULL.

    Scale shape: one data-sized hash agg to ~84 month rows; windows and
    reduces run on the month frame.

    Reference analog: none (engine addition, SURVEY.md §2.7)."""
    orders = load_table(spark, sf_dir, "orders")
    monthly = (
        orders.groupBy(
            (F.year("o_orderdate") * 12 + F.month("o_orderdate") - _KPSS_X0).alias(
                "x"
            )
        )
        .agg(
            F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("bigint"))
            .cast("long")
            .alias("cents")
        )
        .select("x", (F.col("cents").cast("double") / F.lit(_UNIT)).alias("v"))
    )
    tot = monthly.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        (fsum("v", scale=_FS) / F.count(F.lit(1))).alias("ybar"),
    )
    dem = monthly.crossJoin(F.broadcast(tot)).select(
        "x",
        "n",
        (F.col("v") - F.col("ybar")).alias("e"),
        F.floor((F.col("v") - F.col("ybar")) * F.lit(1e9))
        .cast("long")
        .alias("eq"),
    )
    w_cum = Window.orderBy("x").rowsBetween(Window.unboundedPreceding, 0)
    w_lag = Window.orderBy("x")
    s = dem.select(
        "n",
        "e",
        (F.sum("eq").over(w_cum).cast("double") / F.lit(1e9)).alias("s_t"),
        *[F.lag("e", j).over(w_lag).alias(f"e_lag{j}") for j in range(1, _KPSS_LAGS + 1)],
    )
    red = s.agg(
        F.max("n").alias("n"),
        fsum(F.col("s_t") * F.col("s_t"), scale=6).alias("ss2"),
        fsum(F.col("e") * F.col("e"), scale=10).alias("g0"),
        *[
            fsum(
                F.when(
                    F.col(f"e_lag{j}").isNotNull(),
                    F.col("e") * F.col(f"e_lag{j}"),
                ).otherwise(F.lit(0.0)),
                scale=10,
            ).alias(f"g{j}")
            for j in range(1, _KPSS_LAGS + 1)
        ],
    )
    nd = F.col("n").cast("double")
    lp1 = float(_KPSS_LAGS + 1)
    lrv = F.col("g0") / nd
    for j in range(1, _KPSS_LAGS + 1):
        lrv = lrv + F.lit(2.0 * (1.0 - j / lp1)) * F.col(f"g{j}") / nd
    eta = (F.col("ss2") / (nd * nd)) / lrv
    ok = lrv > 0
    return red.select(
        F.col("n").alias("n_periods"),
        F.when(ok, lrv).alias("lrv_bartlett"),
        F.when(ok, eta).alias("kpss_stat"),
        F.when(ok, (eta > F.lit(_KPSS_CRIT_5PCT)).cast("int")).alias(
            "level_nonstationary_5pct"
        ),
    )


q_kpss_test.__doc__ = q_kpss_test.__doc__ and q_kpss_test.__doc__.format(
    l=_KPSS_LAGS, c=_KPSS_CRIT_5PCT
)


def _sql_kpss() -> str:
    lp1 = float(_KPSS_LAGS + 1)
    lags = ",\n         ".join(
        f"LAG(e, {j}) OVER (ORDER BY x) AS e_lag{j}"
        for j in range(1, _KPSS_LAGS + 1)
    )
    gsel = ",\n         ".join(
        f"{sql_fsum(f'CASE WHEN e_lag{j} IS NOT NULL THEN e * e_lag{j} ELSE 0.0 END', 10)} AS g{j}"
        for j in range(1, _KPSS_LAGS + 1)
    )
    lrv = "g0 / CAST(n AS DOUBLE)"
    for j in range(1, _KPSS_LAGS + 1):
        lrv += f" + {2.0 * (1.0 - j / lp1)!r} * g{j} / CAST(n AS DOUBLE)"
    return f"""
WITH monthly AS (
  SELECT YEAR(o_orderdate) * 12 + MONTH(o_orderdate) - {_KPSS_X0} AS x,
         CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS DOUBLE) / 1e9 AS v
  FROM orders GROUP BY 1
), tot AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         {sql_fsum("v", 8)} / COUNT(*) AS ybar
  FROM monthly
), dem AS (
  SELECT x, n, v - ybar AS e,
         CAST(FLOOR((v - ybar) * 1e9) AS BIGINT) AS eq
  FROM monthly CROSS JOIN tot
), s AS (
  SELECT n, e,
         CAST(SUM(eq) OVER (ORDER BY x
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
           / 1e9 AS s_t,
         {lags}
  FROM dem
), red AS (
  SELECT MAX(n) AS n,
         {sql_fsum("s_t * s_t", 6)} AS ss2,
         {sql_fsum("e * e", 10)} AS g0,
         {gsel}
  FROM s
), fin AS (
  SELECT n, ({lrv}) AS lrv,
         (ss2 / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE))) AS num
  FROM red
)
SELECT n AS n_periods,
       CASE WHEN lrv > 0 THEN lrv END AS lrv_bartlett,
       CASE WHEN lrv > 0 THEN num / lrv END AS kpss_stat,
       CASE WHEN lrv > 0
            THEN CAST(num / lrv > {_KPSS_CRIT_5PCT!r} AS INT) END
         AS level_nonstationary_5pct
FROM fin
"""


# ---------------------------------------------------------------------------
# Lo-MacKinlay variance-ratio test (round 14)
# ---------------------------------------------------------------------------

_VR_Q = 4  # aggregation period (quarters of months)
_VR_SQRT_CONST = 1.8708286933869707  # sqrt(2(2q-1)(q-1)/(3q)) at q=4 — literal
_VR_Z_CRIT = 1.959963984540054


def q_variance_ratio_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lo-MacKinlay variance-ratio test (1988) on the monthly-revenue
    series at q={q}: under a drift random walk, the variance of q-month
    changes is q times the 1-month variance, so VR = sigma_q^2 /
    (q*sigma_1^2) near 1; VR < 1 flags mean reversion (the revenue
    series reverts to trend), VR > 1 momentum. The scale-family
    complement of ``kpss_test`` (level test) and ``events_hurst_rs``
    (rescaled range): VR is the one with an asymptotic z under iid —
    z = (VR - 1)*sqrt(m)/{c!r} with m the 1-month difference count
    (homoskedastic form, documented). On DIFFERENCES, not log returns —
    fully rational (module rule: no logs on data).

    Exactness: the series is the exact monthly cents agg in $10M units;
    1-month and q-month changes are IEEE differences of deterministic
    doubles via lag windows over the month order; the drift and both
    MLE variances are floor-quantized reduces over one IEEE division
    each; z adds one allowlisted sqrt of an exact count. Degenerate
    contract: fewer than q+2 months or a zero 1-month variance ->
    VR/z NULL.

    Scale shape: one data-sized hash agg to month rows; lags and
    reduces run on the month frame.

    Reference analog: none (engine addition, SURVEY.md §2.7)."""
    orders = load_table(spark, sf_dir, "orders")
    monthly = (
        orders.groupBy(
            (F.year("o_orderdate") * 12 + F.month("o_orderdate") - _KPSS_X0).alias(
                "x"
            )
        )
        .agg(
            F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("bigint"))
            .cast("long")
            .alias("cents")
        )
        .select("x", (F.col("cents").cast("double") / F.lit(_UNIT)).alias("v"))
    )
    w = Window.orderBy("x")
    diffs = monthly.select(
        (F.col("v") - F.lag("v", 1).over(w)).alias("d1"),
        (F.col("v") - F.lag("v", _VR_Q).over(w)).alias("dq"),
    )
    m1 = diffs.agg(
        F.count("d1").cast("long").alias("m1"),
        F.count("dq").cast("long").alias("mq"),
        (fsum(F.coalesce("d1", F.lit(0.0)), scale=_FS) / F.count("d1")).alias("mu"),
    )
    joined = diffs.crossJoin(F.broadcast(m1))
    red = joined.agg(
        F.max("m1").alias("m1"),
        F.max("mq").alias("mq"),
        F.max("mu").alias("mu"),
        fsum(
            F.when(
                F.col("d1").isNotNull(),
                (F.col("d1") - F.col("mu")) * (F.col("d1") - F.col("mu")),
            ).otherwise(F.lit(0.0)),
            scale=_FS,
        ).alias("ssq1"),
        fsum(
            F.when(
                F.col("dq").isNotNull(),
                (F.col("dq") - F.lit(float(_VR_Q)) * F.col("mu"))
                * (F.col("dq") - F.lit(float(_VR_Q)) * F.col("mu")),
            ).otherwise(F.lit(0.0)),
            scale=_FS,
        ).alias("ssqq"),
    )
    m1d = F.col("m1").cast("double")
    mqd = F.col("mq").cast("double")
    var1 = F.col("ssq1") / m1d
    varq = F.col("ssqq") / mqd
    vr = varq / (F.lit(float(_VR_Q)) * var1)
    z = (vr - F.lit(1.0)) * F.sqrt(m1d) / F.lit(_VR_SQRT_CONST)
    ok = (F.col("mq") >= 2) & (var1 > 0)
    return red.select(
        F.col("m1").alias("n_diffs"),
        F.lit(_VR_Q).cast("long").alias("q_period"),
        F.when(ok, vr).alias("vr_stat"),
        F.when(ok, z).alias("z_vr"),
        F.when(ok, (F.abs(z) > F.lit(_VR_Z_CRIT)).cast("int")).alias(
            "significant_5pct"
        ),
    )


q_variance_ratio_test.__doc__ = q_variance_ratio_test.__doc__ and (
    q_variance_ratio_test.__doc__.format(q=_VR_Q, c=_VR_SQRT_CONST)
)


def _sql_variance_ratio() -> str:
    qf = float(_VR_Q)
    return f"""
WITH monthly AS (
  SELECT YEAR(o_orderdate) * 12 + MONTH(o_orderdate) - {_KPSS_X0} AS x,
         CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS DOUBLE) / 1e9 AS v
  FROM orders GROUP BY 1
), diffs AS (
  SELECT v - LAG(v, 1) OVER (ORDER BY x) AS d1,
         v - LAG(v, {_VR_Q}) OVER (ORDER BY x) AS dq
  FROM monthly
), m AS (
  SELECT CAST(COUNT(d1) AS BIGINT) AS m1,
         CAST(COUNT(dq) AS BIGINT) AS mq,
         {sql_fsum("COALESCE(d1, 0.0)", 8)} / COUNT(d1) AS mu
  FROM diffs
), red AS (
  SELECT MAX(m1) AS m1, MAX(mq) AS mq, MAX(mu) AS mu,
         {sql_fsum("CASE WHEN d1 IS NOT NULL THEN (d1 - mu) * (d1 - mu) ELSE 0.0 END", 8)} AS ssq1,
         {sql_fsum(f"CASE WHEN dq IS NOT NULL THEN (dq - {qf!r} * mu) * (dq - {qf!r} * mu) ELSE 0.0 END", 8)} AS ssqq
  FROM diffs CROSS JOIN m
), fin AS (
  SELECT m1, mq,
         ssq1 / CAST(m1 AS DOUBLE) AS var1,
         (ssqq / CAST(mq AS DOUBLE)) / ({qf!r} * (ssq1 / CAST(m1 AS DOUBLE))) AS vr
  FROM red
)
SELECT m1 AS n_diffs, CAST({_VR_Q} AS BIGINT) AS q_period,
       CASE WHEN mq >= 2 AND var1 > 0 THEN vr END AS vr_stat,
       CASE WHEN mq >= 2 AND var1 > 0
            THEN (vr - 1.0) * SQRT(CAST(m1 AS DOUBLE)) / CAST('{_VR_SQRT_CONST!r}' AS DOUBLE) END AS z_vr,
       CASE WHEN mq >= 2 AND var1 > 0
            THEN CAST(ABS((vr - 1.0) * SQRT(CAST(m1 AS DOUBLE)) / CAST('{_VR_SQRT_CONST!r}' AS DOUBLE))
                      > {_VR_Z_CRIT!r} AS INT) END AS significant_5pct
FROM fin
"""


# ---------------------------------------------------------------------------
# Event-study leads and lags (round 14)
# ---------------------------------------------------------------------------

_EVS_EVENT_YM = 1997 * 12 + 1   # literal event month: 1997-01
_EVS_WINDOW = 6                 # leads/lags: tau in [-6, +6]
_EVS_TREATED_SEG = "BUILDING"


def q_event_study_leads_lags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-study leads-and-lags panel around the literal {d} event
    month: for each relative month tau in [-{w}, +{w}], the difference
    in mean order value between the treated segment ('{s}' customers)
    and all others. The table IS the standard pre-trend diagnostic for
    ``ab_diff_in_differences``: the lead coefficients (tau < 0) should
    hover near zero if the parallel-trends assumption holds, and the
    lag path traces the dynamic treatment effect a single-number DiD
    averages away (Angrist & Pischke 2009, ch. 5).

    Exactness: per-(tau, group) sums are exact integer cents in ONE
    conditional hash agg; each mean is one IEEE division and the
    difference one subtraction. Degenerate contract: a tau month where
    either group is empty -> that row's means/diff NULL (the row is
    still emitted off the literal tau spine).

    Scale shape: scan with a 13-month filter -> one map-side-combinable
    hash agg to 13x2 cells; the spine fill runs on 13 rows.

    Reference analog: none (engine addition, SURVEY.md §2.7)."""
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    ym = F.year("o_orderdate") * 12 + F.month("o_orderdate")
    lo, hi = _EVS_EVENT_YM - _EVS_WINDOW, _EVS_EVENT_YM + _EVS_WINDOW
    cells = (
        orders.filter((ym >= lo) & (ym <= hi))
        .join(F.broadcast(cust), orders["o_custkey"] == cust["c_custkey"])
        .groupBy((ym - _EVS_EVENT_YM).alias("tau"))
        .agg(
            F.sum(
                F.when(F.col("c_mktsegment") == _EVS_TREATED_SEG, 1).otherwise(0)
            )
            .cast("long")
            .alias("n_treated"),
            F.sum(
                F.when(F.col("c_mktsegment") != _EVS_TREATED_SEG, 1).otherwise(0)
            )
            .cast("long")
            .alias("n_control"),
            F.sum(
                F.when(
                    F.col("c_mktsegment") == _EVS_TREATED_SEG,
                    F.round(F.col("o_totalprice") * 100, 0).cast("bigint"),
                ).otherwise(F.lit(0))
            )
            .cast("long")
            .alias("s_treated"),
            F.sum(
                F.when(
                    F.col("c_mktsegment") != _EVS_TREATED_SEG,
                    F.round(F.col("o_totalprice") * 100, 0).cast("bigint"),
                ).otherwise(F.lit(0))
            )
            .cast("long")
            .alias("s_control"),
        )
    )
    spine = spark.range(-_EVS_WINDOW, _EVS_WINDOW + 1).select(
        F.col("id").cast("int").alias("tau")
    )
    full = spine.join(cells, "tau", "left").select(
        "tau",
        F.coalesce("n_treated", F.lit(0)).alias("n_treated"),
        F.coalesce("n_control", F.lit(0)).alias("n_control"),
        F.coalesce("s_treated", F.lit(0)).alias("s_treated"),
        F.coalesce("s_control", F.lit(0)).alias("s_control"),
    )
    mt = F.col("s_treated").cast("double") / (
        F.lit(100.0) * F.col("n_treated").cast("double")
    )
    mc = F.col("s_control").cast("double") / (
        F.lit(100.0) * F.col("n_control").cast("double")
    )
    ok = (F.col("n_treated") > 0) & (F.col("n_control") > 0)
    return full.select(
        "tau",
        "n_treated",
        "n_control",
        F.when(ok, mt).alias("avg_treated"),
        F.when(ok, mc).alias("avg_control"),
        F.when(ok, mt - mc).alias("att_diff"),
    ).orderBy("tau")


q_event_study_leads_lags.__doc__ = q_event_study_leads_lags.__doc__ and (
    q_event_study_leads_lags.__doc__.format(
        d="1997-01", w=_EVS_WINDOW, s=_EVS_TREATED_SEG
    )
)


def _sql_event_study() -> str:
    lo, hi = _EVS_EVENT_YM - _EVS_WINDOW, _EVS_EVENT_YM + _EVS_WINDOW
    n_taus = 2 * _EVS_WINDOW + 1
    return f"""
WITH cells AS (
  SELECT YEAR(o_orderdate) * 12 + MONTH(o_orderdate) - {_EVS_EVENT_YM} AS tau,
         CAST(SUM(CASE WHEN c_mktsegment = '{_EVS_TREATED_SEG}' THEN 1 ELSE 0 END) AS BIGINT) AS n_treated,
         CAST(SUM(CASE WHEN c_mktsegment <> '{_EVS_TREATED_SEG}' THEN 1 ELSE 0 END) AS BIGINT) AS n_control,
         CAST(SUM(CASE WHEN c_mktsegment = '{_EVS_TREATED_SEG}'
                       THEN CAST(ROUND(o_totalprice * 100) AS BIGINT) ELSE 0 END) AS BIGINT) AS s_treated,
         CAST(SUM(CASE WHEN c_mktsegment <> '{_EVS_TREATED_SEG}'
                       THEN CAST(ROUND(o_totalprice * 100) AS BIGINT) ELSE 0 END) AS BIGINT) AS s_control
  FROM orders JOIN customer ON o_custkey = c_custkey
  WHERE YEAR(o_orderdate) * 12 + MONTH(o_orderdate) BETWEEN {lo} AND {hi}
  GROUP BY 1
), spine AS (
  SELECT CAST({-_EVS_WINDOW} + UNNEST(RANGE({n_taus})) AS INT) AS tau
), filled AS (
  SELECT s.tau,
         CAST(COALESCE(c.n_treated, 0) AS BIGINT) AS n_treated,
         CAST(COALESCE(c.n_control, 0) AS BIGINT) AS n_control,
         CAST(COALESCE(c.s_treated, 0) AS BIGINT) AS s_treated,
         CAST(COALESCE(c.s_control, 0) AS BIGINT) AS s_control
  FROM spine s LEFT JOIN cells c ON s.tau = c.tau
)
SELECT tau, n_treated, n_control,
       CASE WHEN n_treated > 0 AND n_control > 0
            THEN CAST(s_treated AS DOUBLE) / (100.0 * CAST(n_treated AS DOUBLE)) END AS avg_treated,
       CASE WHEN n_treated > 0 AND n_control > 0
            THEN CAST(s_control AS DOUBLE) / (100.0 * CAST(n_control AS DOUBLE)) END AS avg_control,
       CASE WHEN n_treated > 0 AND n_control > 0
            THEN CAST(s_treated AS DOUBLE) / (100.0 * CAST(n_treated AS DOUBLE))
                 - CAST(s_control AS DOUBLE) / (100.0 * CAST(n_control AS DOUBLE)) END AS att_diff
FROM filled
ORDER BY tau
"""


# ---------------------------------------------------------------------------
# Hosmer-Lemeshow calibration test (round 14)
# ---------------------------------------------------------------------------

_HL_TRAIN_PCT = 80
_HL_BINS = 10
_HL_P_SCALE = 6
_HL_CHI2_CRIT_DF8 = 15.50731305586545  # chi2(G-2)=chi2(8) 95% — literal


def q_hosmer_lemeshow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hosmer-Lemeshow goodness-of-fit test for the urgent-order
    classifier: train-fold rates by (market segment x region) — a
    25-cell model, finer than ``calibration_ece``'s 5 segments — are
    scored on the held-out test fold, test rows are cut into G={g}
    equal-count groups by predicted p (the canonical "deciles of risk"),
    and HL = sum_g (O_g - E_g)^2 / sum_g[p(1-p)] with O observed
    urgents and E expected. ECE measures HOW FAR calibration is off,
    ``spiegelhalter_z`` whether the unbinned drift is real; HL is the
    binned chi-square the clinical-model literature standardizes on
    (Hosmer & Lemeshow 1980), judged at the literal chi2(G-2) cut.

    Exactness: the md5 split and scaled-integer rates follow the
    ``calibration_ece`` contract (p floor-quantized to 1e-{s} — both
    engines compare equal integers); the decile cut is the exact rank
    formula g = (rn-1)*G DIV n over the (pnum, custkey, orderkey) total
    order; per-bin O, n, sum(pnum) are exact integers and
    sum pnum*(q-pnum) is an exact DECIMAL, so each bin term is one
    fixed IEEE sequence and the G-term reduce is floor-quantized
    (scale 10 — the statistic is O(G), so the bound holds at any SF). Inner-join contract: a (segment x region) cell whose
    rows all hash into the test split is dropped from the test fold
    (the documented ``spiegelhalter_z`` semantics — n_test counts
    scoreable rows). Degenerate contract: a bin with zero variance mass
    contributes NULL -> the statistic NULLs (surfaced, not hidden);
    significance additionally guarded on the measured G = {g}.

    Scale shape: one fact x two broadcast dims, one 25-cell train agg,
    the ``_cum_prev`` bucketed rank over the test fold (r14
    optimization — no single-task sort), one G-row reduce.

    Reference analog: none (engine addition, SURVEY.md §2.7)."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_orderkey",
        F.when(F.col("o_orderpriority") == "1-URGENT", F.lit(1))
        .otherwise(F.lit(0))
        .alias("y"),
    )
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment", "c_nationkey"
    )
    nation = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_regionkey")
    joined = (
        orders.join(F.broadcast(cust), orders["o_custkey"] == cust["c_custkey"])
        .join(F.broadcast(nation), cust["c_nationkey"] == nation["n_nationkey"])
        .withColumn(
            "_b",
            F.conv(
                F.substring(F.md5(F.col("o_custkey").cast("string")), 1, 15), 16, 10
            ).cast("bigint")
            % 100,
        )
    )
    train = joined.filter(F.col("_b") < _HL_TRAIN_PCT)
    test = joined.filter(F.col("_b") >= _HL_TRAIN_PCT)
    q = float(10**_HL_P_SCALE)
    rate = (
        train.groupBy("c_mktsegment", "n_regionkey")
        .agg(
            F.sum("y").cast("long").alias("n_urgent"),
            F.count(F.lit(1)).cast("long").alias("n_train"),
        )
        .select(
            "c_mktsegment",
            "n_regionkey",
            F.floor(
                F.col("n_urgent").cast("double")
                / F.col("n_train").cast("double")
                * F.lit(q)
            )
            .cast("long")
            .alias("pnum"),
        )
    )
    scored = test.join(F.broadcast(rate), ["c_mktsegment", "n_regionkey"]).select(
        "y", "pnum", "o_custkey", "o_orderkey"
    )
    # pnum is TIE-HEAVY (≤25 distinct quantized rates over the whole test
    # fold — the r15 skew audit measured 4.9% of rows in one bucket under
    # a pnum-only grid), so the rank uses the two-level tie decomposition
    # (distinct-pnum offsets + within-pnum key rank); n_test comes from
    # the same distinct-pnum frame (with_totals), dropping the separate
    # count aggregation and its broadcast cross join. Value-identical.
    binned = (
        _rank_prev_tied(
            scored,
            "pnum",
            ["o_custkey", "o_orderkey"],
            "_rp",
            materialize=True,
            with_totals=True,
        )
        .select(
            "y",
            "pnum",
            F.col("_rp_tot").alias("n_test"),
            (F.col("_rp") + F.lit(1)).alias("rn"),
        )
        .select(
            "y",
            "pnum",
            "n_test",
            F.expr(f"((rn - 1) * {_HL_BINS}) DIV n_test").alias("g"),
        )
    )
    qi = 10**_HL_P_SCALE
    per_bin = binned.groupBy("g").agg(
        F.max("n_test").alias("n_test"),
        F.count(F.lit(1)).cast("long").alias("n_g"),
        F.sum("y").cast("long").alias("o_g"),
        F.sum("pnum").cast("long").alias("sp"),
        F.sum(
            (F.col("pnum") * (F.lit(qi) - F.col("pnum"))).cast("decimal(38,0)")
        )
        .cast("decimal(38,0)")
        .alias("spq"),
    )
    e_g = F.col("sp").cast("double") / F.lit(q)
    v_g = dec_to_double(F.col("spq")) / F.lit(q * q)
    term = (
        (F.col("o_g").cast("double") - e_g)
        * (F.col("o_g").cast("double") - e_g)
        / v_g
    )
    red = per_bin.select(
        "n_test", F.when(F.col("spq") > 0, term).alias("term")
    ).agg(
        F.max("n_test").alias("n_test"),
        F.count(F.lit(1)).cast("long").alias("g_bins"),
        F.count("term").cast("long").alias("g_valid"),
        fsum(F.coalesce("term", F.lit(0.0)), scale=10).alias("hl_raw"),
    )
    ok = F.col("g_valid") == F.col("g_bins")
    hl = F.when(ok, F.col("hl_raw"))
    return red.select(
        "n_test",
        "g_bins",
        hl.alias("hl_stat"),
        F.when(
            ok & (F.col("g_bins") == _HL_BINS),
            (hl > F.lit(_HL_CHI2_CRIT_DF8)).cast("int"),
        ).alias("significant_5pct"),
    )


q_hosmer_lemeshow.__doc__ = q_hosmer_lemeshow.__doc__ and (
    q_hosmer_lemeshow.__doc__.format(g=_HL_BINS, s=_HL_P_SCALE)
)


def _sql_hosmer_lemeshow() -> str:
    q = float(10**_HL_P_SCALE)
    qi = 10**_HL_P_SCALE
    return f"""
WITH base AS (
  SELECT o_custkey, o_orderkey,
         CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END AS y,
         c_mktsegment, n_regionkey,
         ({_sql_hex_to_int("md5(CAST(o_custkey AS VARCHAR))", 1, 15)} % 100) AS _b
  FROM orders
  JOIN customer ON o_custkey = c_custkey
  JOIN nation ON c_nationkey = n_nationkey
), rate AS (
  SELECT c_mktsegment, n_regionkey,
         CAST(FLOOR(CAST(SUM(y) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) * {q!r}) AS BIGINT) AS pnum
  FROM base WHERE _b < {_HL_TRAIN_PCT}
  GROUP BY 1, 2
), scored AS (
  SELECT t.y, r.pnum, t.o_custkey, t.o_orderkey
  FROM base t JOIN rate r
    ON t.c_mktsegment = r.c_mktsegment AND t.n_regionkey = r.n_regionkey
  WHERE t._b >= {_HL_TRAIN_PCT}
), tot AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_test FROM scored
), binned AS (
  SELECT y, pnum, n_test,
         ((CAST(ROW_NUMBER() OVER (ORDER BY pnum, o_custkey, o_orderkey) AS BIGINT) - 1)
          * {_HL_BINS}) // n_test AS g
  FROM scored CROSS JOIN tot
), per_bin AS (
  SELECT g,
         MAX(n_test) AS n_test,
         CAST(COUNT(*) AS BIGINT) AS n_g,
         CAST(SUM(y) AS BIGINT) AS o_g,
         CAST(SUM(pnum) AS BIGINT) AS sp,
         CAST(SUM(CAST(pnum * ({qi} - pnum) AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS spq
  FROM binned GROUP BY 1
), terms AS (
  SELECT n_test,
         CASE WHEN spq > 0
              THEN (CAST(o_g AS DOUBLE) - CAST(sp AS DOUBLE) / {q!r})
                   * (CAST(o_g AS DOUBLE) - CAST(sp AS DOUBLE) / {q!r})
                   / ({sql_dec_to_double("spq")} / {q * q!r}) END AS term
  FROM per_bin
), red AS (
  SELECT MAX(n_test) AS n_test,
         CAST(COUNT(*) AS BIGINT) AS g_bins,
         CAST(COUNT(term) AS BIGINT) AS g_valid,
         {sql_fsum("COALESCE(term, 0.0)", 10)} AS hl_raw
  FROM terms
)
SELECT n_test, g_bins,
       CASE WHEN g_valid = g_bins THEN hl_raw END AS hl_stat,
       CASE WHEN g_valid = g_bins AND g_bins = {_HL_BINS}
            THEN CAST(hl_raw > {_HL_CHI2_CRIT_DF8!r} AS INT) END AS significant_5pct
FROM red
"""


QUERIES = {
    "kpss_test": q_kpss_test,
    "variance_ratio_test": q_variance_ratio_test,
    "event_study_leads_lags": q_event_study_leads_lags,
    "hosmer_lemeshow": q_hosmer_lemeshow,
    "goldfeld_quandt": q_goldfeld_quandt,
    "somers_d": q_somers_d,
    "calibration_ece": q_calibration_ece,
    "classifier_confusion_metrics": q_classifier_confusion_metrics,
    "odds_ratio_binning": q_odds_ratio_binning,
    "propensity_smd_balance": q_propensity_smd_balance,
    "acf_lags": q_acf_lags,
    "seasonal_mann_kendall": q_seasonal_mann_kendall,
    "conformal_interval": q_conformal_interval,
    "interrupted_time_series": q_interrupted_time_series,
    "pacf_closed_form": q_pacf_closed_form,
    "mmd_poly_two_sample": q_mmd_poly_two_sample,
    "evt_gumbel_block_maxima": q_evt_gumbel_block_maxima,
    "ljung_box_q": q_ljung_box_q,
    "theils_u_forecast": q_theils_u_forecast,
    "grubbs_statistic": q_grubbs_statistic,
    "kendalls_w": q_kendalls_w,
    "mcnemar_paired": q_mcnemar_paired,
    "cronbachs_alpha": q_cronbachs_alpha,
    "roc_auc_exact": q_roc_auc_exact,
    "average_precision_exact": q_average_precision_exact,
    "youden_j_threshold": q_youden_j_threshold,
    "spiegelhalter_z": q_spiegelhalter_z,
    "auc_delong_se": q_auc_delong_se,
    "brier_decomposition": q_brier_decomposition,
    "survival_nelson_aalen": q_survival_nelson_aalen,
    "survival_logrank": q_survival_logrank,
    "page_trend_test": q_page_trend_test,
    "mann_kendall_trend": q_mann_kendall_trend,
    "chow_test": q_chow_test,
    "regression_influence": q_regression_influence,
    "wilcoxon_signed_rank": q_wilcoxon_signed_rank,
    "energy_distance_two_sample": q_energy_distance_two_sample,
    "cohens_d_effect": q_cohens_d_effect,
    "atkinson_inequality": q_atkinson_inequality,
    "lin_ccc_agreement": q_lin_ccc_agreement,
    "bland_altman_agreement": q_bland_altman_agreement,
    "goodman_kruskal_gamma": q_goodman_kruskal_gamma,
    "gini_split_gain": q_gini_split_gain,
    "icc_oneway": q_icc_oneway,
    "stuart_maxwell_test": q_stuart_maxwell_test,
    "dixon_q_outlier": q_dixon_q_outlier,
}

ORACLE = {
    "kpss_test": _sql_kpss(),
    "variance_ratio_test": _sql_variance_ratio(),
    "event_study_leads_lags": _sql_event_study(),
    "hosmer_lemeshow": _sql_hosmer_lemeshow(),
    "goldfeld_quandt": _sql_goldfeld_quandt(),
    "somers_d": _ORACLE_SOMERS_D,
    "calibration_ece": _ORACLE_ECE,
    "classifier_confusion_metrics": _ORACLE_CONFUSION,
    "seasonal_mann_kendall": _ORACLE_SEASONAL_MK,
    "odds_ratio_binning": _ORACLE_ODDS_RATIO_BINNING,
    "propensity_smd_balance": _sql_smd_balance(),
    "acf_lags": _ORACLE_ACF,
    "conformal_interval": _ORACLE_CONFORMAL,
    "interrupted_time_series": _sql_its(),
    "pacf_closed_form": _ORACLE_PACF,
    "mmd_poly_two_sample": _ORACLE_MMD,
    "evt_gumbel_block_maxima": _ORACLE_GUMBEL,
    "ljung_box_q": _ORACLE_LJUNG_BOX,
    "theils_u_forecast": _ORACLE_THEILS_U,
    "grubbs_statistic": _ORACLE_GRUBBS,
    "kendalls_w": _ORACLE_KENDALLS_W,
    "mcnemar_paired": _ORACLE_MCNEMAR,
    "cronbachs_alpha": _ORACLE_CRONBACH,
    "roc_auc_exact": _ORACLE_ROC_AUC,
    "average_precision_exact": _ORACLE_AVERAGE_PRECISION,
    "youden_j_threshold": _ORACLE_YOUDEN,
    "spiegelhalter_z": _sql_spiegelhalter(),
    "auc_delong_se": _sql_auc_delong(),
    "brier_decomposition": _ORACLE_BRIER,
    "survival_nelson_aalen": _ORACLE_NELSON_AALEN,
    "survival_logrank": _ORACLE_LOGRANK,
    "page_trend_test": _ORACLE_PAGE_TREND,
    "mann_kendall_trend": _ORACLE_MANN_KENDALL,
    "chow_test": _sql_chow(),
    "regression_influence": _sql_reg_influence(),
    "wilcoxon_signed_rank": _ORACLE_WILCOXON,
    "energy_distance_two_sample": _ORACLE_ENERGY,
    "cohens_d_effect": _ORACLE_COHENS_D,
    "atkinson_inequality": _ORACLE_ATKINSON,
    "lin_ccc_agreement": _ORACLE_LIN_CCC,
    "bland_altman_agreement": _ORACLE_BLAND_ALTMAN,
    "goodman_kruskal_gamma": _ORACLE_GK_GAMMA,
    "gini_split_gain": _ORACLE_GINI_SPLIT,
    "icc_oneway": _ORACLE_ICC,
    "stuart_maxwell_test": _sql_stuart_maxwell(),
    "dixon_q_outlier": _ORACLE_DIXON,
}
