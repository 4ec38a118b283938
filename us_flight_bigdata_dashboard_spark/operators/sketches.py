"""Mergeable streaming sketches with DETERMINISTIC cross-engine hashes:
Count-Min frequency estimation and a register-based HyperLogLog, each
verified against exact counts in the same result row.

Extension scope (the reference has no sketches — its analytics are exact
pandas aggregates over a 1.6M-row CSV; src/aggregate_flight_data.py). At
100 TB, frequency and cardinality questions are answered by fixed-size
mergeable summaries: a sketch built per partition merges associatively in
the map-side combine, so the shuffle carries O(sketch) bytes instead of
O(distinct keys). These operators build the sketch AS a DataFrame
aggregate (the sketch table IS the group-by result — d·w / m rows total,
independent of data size) and then read estimates off it, reporting the
exact value next to the estimate so the error is visible and gate-checked.

Determinism policy: hashes are affine maps mod a Mersenne prime (CMS) or
md5-derived integers (HLL) — identical literals on both engines; all
arithmetic is integer except one final correctly-rounded division per
estimate, so results are bit-identical across engines, partitionings, and
platforms (see tests/test_numeric_portability.py). The usual HLL
small-range "linear counting" correction needs log — a transcendental this
matrix bans — so the operator reports the RAW estimator (documented; the
relative-error column is part of the contract and the gate)."""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from us_flight_bigdata_dashboard_spark.operators.dedup import _sql_hex_to_int
from us_flight_bigdata_dashboard_spark.sources.catalog import load_table

# ---------------------------------------------------------------------------
# Count-Min sketch: customer order-frequency estimates
# ---------------------------------------------------------------------------

CMS_P = 2147483647  # 2^31 − 1 (Mersenne prime)
CMS_W = 256  # buckets per row
CMS_D = 4  # hash rows
# (a, b) affine coefficients per row — arbitrary fixed literals < P
CMS_COEF = [(131071, 8191), (524287, 127), (6700417, 2047), (2147483629, 524287)]
CMS_TOPK = 10


def q_sketch_cms_freq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Min frequency estimates for the top-K most frequent order
    customers, next to their exact counts. The sketch is a (row j,
    bucket h_j(key)) → count aggregate — d·w = 1024 cells TOTAL
    regardless of data size, built in one map-side-combinable pass; the
    estimate for a key is min_j cell[j][h_j(key)], which can only
    OVERcount (collisions add), never undercount — the ``overestimate``
    column exhibits the one-sided guarantee and the gate checks it
    cross-engine.

    Scale shape: data is touched once (explode ×d); everything after is
    sketch-sized. Probing joins the K query keys against 1024 cells —
    broadcast territory. At 100 TB the d·w grid is the ONLY state that
    crosses the wire."""
    orders = load_table(spark, sf_dir, "orders").select("o_custkey")
    cells = None
    for j, (a, b) in enumerate(CMS_COEF):
        h = (
            (F.col("o_custkey") * F.lit(a) + F.lit(b)) % F.lit(CMS_P)
        ) % F.lit(CMS_W)
        part = orders.select(F.lit(j).alias("j"), h.alias("bucket"))
        cells = part if cells is None else cells.unionAll(part)
    sketch = cells.groupBy("j", "bucket").agg(F.count(F.lit(1)).alias("cnt"))

    exact = orders.groupBy("o_custkey").agg(F.count(F.lit(1)).alias("exact_cnt"))
    probe = exact.orderBy(
        F.col("exact_cnt").desc(), F.col("o_custkey").asc()
    ).limit(CMS_TOPK)
    probed = None
    for j, (a, b) in enumerate(CMS_COEF):
        h = (
            (F.col("o_custkey") * F.lit(a) + F.lit(b)) % F.lit(CMS_P)
        ) % F.lit(CMS_W)
        leg = probe.select(
            "o_custkey", "exact_cnt", F.lit(j).alias("j"), h.alias("bucket")
        )
        probed = leg if probed is None else probed.unionAll(leg)
    est = (
        probed.join(F.broadcast(sketch), ["j", "bucket"])
        .groupBy("o_custkey", "exact_cnt")
        .agg(F.min("cnt").alias("cms_est"))
    )
    return est.select(
        "o_custkey",
        F.col("exact_cnt").cast("long").alias("exact_cnt"),
        F.col("cms_est").cast("long").alias("cms_est"),
        (F.col("cms_est") - F.col("exact_cnt")).cast("long").alias("overestimate"),
    ).orderBy(F.col("exact_cnt").desc(), F.col("o_custkey").asc())


def _sql_cms() -> str:
    legs = " UNION ALL ".join(
        f"SELECT {j} AS j, ((o_custkey * {a} + {b}) % {CMS_P}) % {CMS_W} AS bucket"
        " FROM orders"
        for j, (a, b) in enumerate(CMS_COEF)
    )
    probe_legs = " UNION ALL ".join(
        f"SELECT o_custkey, exact_cnt, {j} AS j,"
        f" ((o_custkey * {a} + {b}) % {CMS_P}) % {CMS_W} AS bucket FROM probe"
        for j, (a, b) in enumerate(CMS_COEF)
    )
    return f"""
WITH cells AS ({legs}),
sketch AS (SELECT j, bucket, COUNT(*) AS cnt FROM cells GROUP BY j, bucket),
exact AS (SELECT o_custkey, COUNT(*) AS exact_cnt FROM orders GROUP BY o_custkey),
probe AS (SELECT * FROM exact ORDER BY exact_cnt DESC, o_custkey ASC LIMIT {CMS_TOPK}),
probed AS ({probe_legs}),
est AS (
  SELECT p.o_custkey, p.exact_cnt, MIN(s.cnt) AS cms_est
  FROM probed p JOIN sketch s USING (j, bucket)
  GROUP BY p.o_custkey, p.exact_cnt
)
SELECT o_custkey, CAST(exact_cnt AS BIGINT) AS exact_cnt,
       CAST(cms_est AS BIGINT) AS cms_est,
       CAST(cms_est - exact_cnt AS BIGINT) AS overestimate
FROM est
ORDER BY exact_cnt DESC, o_custkey ASC
"""


# ---------------------------------------------------------------------------
# HyperLogLog registers: distinct customers per order-priority
# ---------------------------------------------------------------------------

HLL_M = 256  # registers (b = 8 bits)
HLL_REST_BITS = 40  # hash bits that feed the rank (48-bit md5 prefix − 8)
# alpha_256 = 0.7213/(1 + 1.079/256) — a fixed rational literal, evaluated
# once here in Python (exact same double constant lands in both plans).
HLL_ALPHA = 0.7213 / (1.0 + 1.079 / 256.0)
# Single fused numerator constant alpha·m²·2^50: folding it HERE (IEEE
# Python doubles) guarantees both engines divide the IDENTICAL double by
# int_sum — one correctly-rounded op each, no multiplication-order skew.
HLL_SCALE = HLL_ALPHA * float(HLL_M * HLL_M) * float(2**50)

# Small-range (linear-counting) correction, Flajolet et al. §4: when the
# raw estimate is ≤ 2.5·m and some registers are still zero, the better
# estimator is m·ln(m/V) with V = zero-register count. ln() is banned by
# the portability policy, but V is an INTEGER in 1..m — so the entire
# correction is a 256-row lookup table of Python-precomputed doubles
# (the layout.py Hilbert-LUT escape): both engines join the SAME literal
# table, neither evaluates a transcendental. V=0 has no row (no
# correction applies there by definition).
HLL_LC_THRESHOLD = 2.5 * float(HLL_M)
_HLL_LC_LUT = [
    (v, float(HLL_M) * math.log(float(HLL_M) / float(v)))
    for v in range(1, HLL_M + 1)
]


def _lc_lut_df(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(_HLL_LC_LUT, "v LONG, lc_est DOUBLE")


def _sql_lc_lut() -> str:
    rows = ", ".join(
        f"({v}, CAST({lc!r} AS DOUBLE))" for v, lc in _HLL_LC_LUT
    )
    return f"(VALUES {rows}) lut(v, lc_est)"


def q_sketch_hll_registers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Register-based HyperLogLog estimate of distinct customers per
    order priority, next to the exact COUNT(DISTINCT). Hash =
    48-bit md5 prefix; low 8 bits pick one of 256 registers, the
    remaining 40 bits' leading-zero rank (computed INTEGER-only via
    ``length(bin(rest))`` — no log2) updates the register max. The
    estimator is alpha·m²/Σ2^{-M_j} with the sum carried as the exact
    integer Σ2^{50−M_j}, so the only floating-point op is the final
    division. The small-range linear-counting correction m·ln(m/V)
    (raw ≤ 2.5m with V zero registers remaining) ships as ``hll_est``
    WITHOUT either engine evaluating ln(): V is an integer in 1..m, so
    the correction is a 256-row broadcast LUT of Python-precomputed
    doubles both engines join identically (the Hilbert-LUT escape from
    the no-transcendentals policy). Gate-checked ``rel_err_pct`` /
    ``rel_err_corr_pct`` keep both estimators honest.

    Scale shape: the register table is ≤ groups·m rows — a group-by
    whose map-side combine IS the sketch merge (max per register).
    COUNT(DISTINCT) sits beside it as the verification baseline (itself
    a two-phase exact agg); in production you drop that column and keep
    the O(m) sketch."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderpriority", "o_custkey"
    )
    x = F.conv(F.substring(F.md5(F.col("o_custkey").cast("string")), 1, 12), 16, 10).cast(
        "bigint"
    )
    hashed = orders.select(
        "o_orderpriority",
        (x % F.lit(HLL_M)).alias("reg"),
        F.shiftright(x, 8).alias("rest"),  # integer //256, matches SQL //
    )
    # rank = leading-zero count within REST_BITS + 1; bin() length is the
    # bit position of the highest set bit (integer-exact on both engines)
    rho = F.when(F.col("rest") == 0, F.lit(HLL_REST_BITS + 1)).otherwise(
        F.lit(HLL_REST_BITS + 1) - F.length(F.bin(F.col("rest")))
    )
    regs = (
        hashed.select("o_orderpriority", "reg", rho.alias("rho"))
        .groupBy("o_orderpriority", "reg")
        .agg(F.max("rho").alias("m_j"))
    )
    # Absent registers (M_j = 0) fold in ARITHMETICALLY: each contributes
    # exactly 2^50 to the harmonic integer sum, and the zero-register
    # count is m minus the present-register count (present registers
    # always have M_j >= 1). This replaces the r8 priorities×m grid
    # crossJoin + left join with plain agg arithmetic (VERDICT r8 ask #6).
    est = regs.groupBy("o_orderpriority").agg(
        # SQL shiftleft accepts a column shift (the python wrapper doesn't)
        (
            F.sum(F.expr("shiftleft(CAST(1 AS BIGINT), CAST(50 - m_j AS INT))"))
            + (F.lit(HLL_M) - F.count(F.lit(1))) * F.lit(2**50)
        ).alias("int_sum"),
        # zero-register count: the exact input of the small-range
        # linear-counting correction m·ln(m/V) (ln ships via the LUT;
        # V itself is integer-exact and portable)
        (F.lit(HLL_M) - F.count(F.lit(1))).cast("bigint").alias("zero_regs"),
    )
    exact = orders.groupBy("o_orderpriority").agg(
        F.countDistinct("o_custkey").alias("exact_distinct")
    )
    raw = F.lit(HLL_SCALE) / F.col("int_sum").cast("double")
    corr = F.when(
        (raw <= F.lit(HLL_LC_THRESHOLD)) & (F.col("zero_regs") > 0),
        F.col("lc_est"),
    ).otherwise(raw)
    exact_d = F.col("exact_distinct").cast("double")
    return (
        est.join(exact, "o_orderpriority")
        .join(
            F.broadcast(_lc_lut_df(orders.sparkSession)),
            F.col("zero_regs") == F.col("v"),
            "left",
        )
        .select(
            "o_orderpriority",
            F.col("exact_distinct").cast("long").alias("exact_distinct"),
            raw.alias("hll_raw_est"),
            corr.alias("hll_est"),
            ((raw - exact_d) / exact_d * F.lit(100.0)).alias("rel_err_pct"),
            ((corr - exact_d) / exact_d * F.lit(100.0)).alias("rel_err_corr_pct"),
            F.col("zero_regs").cast("long").alias("zero_regs"),
        )
        .orderBy("o_orderpriority")
    )


def _sql_hll() -> str:
    x = _sql_hex_to_int("md5(CAST(o_custkey AS VARCHAR))", 1, 12)
    return f"""
WITH hashed AS (
  SELECT o_orderpriority,
         {x} % {HLL_M} AS reg,
         {x} // {HLL_M} AS rest
  FROM orders
), rho AS (
  SELECT o_orderpriority, reg,
         CASE WHEN rest = 0 THEN {HLL_REST_BITS + 1}
              ELSE {HLL_REST_BITS + 1} - length(bin(rest))
         END AS rho
  FROM hashed
), regs AS (
  SELECT o_orderpriority, reg, MAX(rho) AS m_j FROM rho GROUP BY 1, 2
), est AS (
  SELECT o_orderpriority,
         SUM((CAST(1 AS BIGINT) << (50 - m_j)))
           + ({HLL_M} - COUNT(*)) * (CAST(1 AS BIGINT) << 50) AS int_sum,
         CAST({HLL_M} - COUNT(*) AS BIGINT) AS zero_regs
  FROM regs GROUP BY o_orderpriority
), exact AS (
  SELECT o_orderpriority, COUNT(DISTINCT o_custkey) AS exact_distinct
  FROM orders GROUP BY o_orderpriority
), sel AS (
  SELECT e.o_orderpriority,
         CAST(x.exact_distinct AS BIGINT) AS exact_distinct,
         CAST({HLL_SCALE!r} AS DOUBLE)
           / CAST(e.int_sum AS DOUBLE) AS hll_raw_est,
         CAST(e.zero_regs AS BIGINT) AS zero_regs,
         lut.lc_est
  FROM est e JOIN exact x USING (o_orderpriority)
  LEFT JOIN {_sql_lc_lut()} ON lut.v = e.zero_regs
), corr AS (
  SELECT o_orderpriority, exact_distinct, hll_raw_est, zero_regs,
         CASE WHEN hll_raw_est <= CAST({HLL_LC_THRESHOLD!r} AS DOUBLE)
                   AND zero_regs > 0
              THEN lc_est ELSE hll_raw_est END AS hll_est
  FROM sel
)
SELECT o_orderpriority, exact_distinct, hll_raw_est, hll_est,
       (hll_raw_est - CAST(exact_distinct AS DOUBLE))
         / CAST(exact_distinct AS DOUBLE) * 100.0 AS rel_err_pct,
       (hll_est - CAST(exact_distinct AS DOUBLE))
         / CAST(exact_distinct AS DOUBLE) * 100.0 AS rel_err_corr_pct,
       zero_regs
FROM corr
ORDER BY o_orderpriority
"""


# ---------------------------------------------------------------------------
# Equi-width histogram quantile sketch (deterministic, mergeable)
# ---------------------------------------------------------------------------

HISTQ_W = 256                 # buckets; error bound = range / W
HISTQ_QS = [0.5, 0.95]        # quantiles to estimate


def q_sketch_histogram_quantile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantile estimation from a {w}-bucket equi-width histogram sketch
    of order value — the third mergeable sketch beside Count-Min and the
    HLL registers, and the DETERMINISTIC counterpart of
    ``approx_percentile`` (KLL is engine-specific and RNG-free only in
    implementation; bucket counts are exact integers that merge by
    addition, so the same sketch built on any partitioning or engine
    gives bit-identical estimates — this entry sits in the EXACT gate,
    no bounds needed). The a-priori error bound (range/{w}) ships in the
    result; tests assert |estimate − exact quantile| ≤ bound.

    Scale shape: one min/max/count agg, ONE map-side-combinable hash agg
    to ≤{w} cells (the sketch IS the aggregate — sketch-sized shuffles at
    any data size, the CMS property), cumulative + rank-pick arithmetic
    on the {w}-row frame.
    """
    from pyspark.sql import Window

    orders = load_table(spark, sf_dir, "orders")
    stats = orders.agg(
        F.min("o_totalprice").alias("mn"),
        F.max("o_totalprice").alias("mx"),
        F.count(F.lit(1)).cast("long").alias("n"),
    )
    base = orders.select("o_totalprice").crossJoin(F.broadcast(stats))
    b = F.least(
        F.lit(HISTQ_W - 1),
        F.floor(
            (F.col("o_totalprice") - F.col("mn"))
            * HISTQ_W
            / (F.col("mx") - F.col("mn"))
        ),
    ).cast("int")
    hist = base.groupBy(b.alias("b"), "mn", "mx", "n").agg(
        F.count(F.lit(1)).cast("long").alias("cnt")
    )
    w_cum = Window.orderBy("b").rowsBetween(Window.unboundedPreceding, 0)
    cum = hist.select(
        "b",
        "mn",
        "mx",
        "n",
        "cnt",
        F.sum("cnt").over(w_cum).cast("long").alias("c_le"),
    )
    qs = F.explode(F.array(*[F.lit(q) for q in HISTQ_QS])).alias("q")
    picks = (
        cum.select(qs, "b", "mn", "mx", "n", "cnt", "c_le")
        .withColumn("r", F.ceil(F.col("q") * F.col("n").cast("double")).cast("long"))
        .filter(
            (F.col("c_le") >= F.col("r"))
            & (F.col("c_le") - F.col("cnt") < F.col("r"))
        )
    )
    width = (F.col("mx") - F.col("mn")) / F.lit(float(HISTQ_W))
    est = F.col("mn") + (
        F.col("b").cast("double")
        + (F.col("r") - (F.col("c_le") - F.col("cnt"))).cast("double")
        / F.col("cnt").cast("double")
    ) * width
    return picks.select(
        F.col("q").alias("quantile"),
        F.col("n").alias("n_rows"),
        F.col("b").alias("bucket_idx"),
        est.alias("estimate"),
        width.alias("error_bound"),
    ).orderBy("quantile")
q_sketch_histogram_quantile.__doc__ = q_sketch_histogram_quantile.__doc__ and q_sketch_histogram_quantile.__doc__.format(w=HISTQ_W)


def _sql_histq() -> str:
    qs = ", ".join(f"CAST('{q!r}' AS DOUBLE)" for q in HISTQ_QS)
    return f"""
WITH stats AS (
  SELECT MIN(o_totalprice) AS mn, MAX(o_totalprice) AS mx,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM orders
), hist AS (
  SELECT LEAST({HISTQ_W - 1},
               CAST(FLOOR((o_totalprice - mn) * {HISTQ_W} / (mx - mn)) AS BIGINT))
           AS b,
         mn, mx, n, CAST(COUNT(*) AS BIGINT) AS cnt
  FROM orders, stats
  GROUP BY 1, 2, 3, 4
), cum AS (
  SELECT b, mn, mx, n, cnt,
         CAST(SUM(cnt) OVER (ORDER BY b
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS c_le
  FROM hist
), picks AS (
  SELECT q, b, mn, mx, n, cnt, c_le,
         CAST(CEIL(q * CAST(n AS DOUBLE)) AS BIGINT) AS r
  FROM cum, (SELECT unnest([{qs}]) AS q)
)
SELECT q AS quantile, n AS n_rows, CAST(b AS INTEGER) AS bucket_idx,
       mn + (CAST(b AS DOUBLE)
             + CAST(r - (c_le - cnt) AS DOUBLE) / CAST(cnt AS DOUBLE))
            * ((mx - mn) / {float(HISTQ_W)}) AS estimate,
       (mx - mn) / {float(HISTQ_W)} AS error_bound
FROM picks
WHERE c_le >= r AND c_le - cnt < r
ORDER BY quantile
"""


# ---------------------------------------------------------------------------
# HLL sketch MERGE (union cardinality from per-group registers)
# ---------------------------------------------------------------------------

HLL_UNION_A, HLL_UNION_B = "1-URGENT", "2-HIGH"


def q_sketch_hll_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The mergeability PROOF for the register HLL: the union cardinality
    of two customer populations ('{a}' ∪ '{b}') estimated by MERGING the
    two groups' register vectors (per-register MAX — the one-line
    operation that makes HLL the distributed distinct-count sketch:
    shards/segments/days sketch independently, the union is free), gated
    beside the exact distinct of the union. ``sketch_hll_registers``
    gates the estimator; this entry gates the ALGEBRA — a wrong merge
    (e.g. summing registers) shifts union_est and fails the hash.

    Same integer determinism as the base entry: ranks via length(bin()),
    harmonic sum carried as exact Σ2^(50−M_j), one final division.
    Scale shape: per-group register build is a (group, reg) MAX hash agg
    (map-side combinable — the agg IS the sketch merge); the union merge
    is a MAX over a ≤2·m-row frame.
    """
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority").isin(HLL_UNION_A, HLL_UNION_B)
    )
    x = F.conv(
        F.substring(F.md5(F.col("o_custkey").cast("string")), 1, 12), 16, 10
    ).cast("bigint")
    hashed = orders.select(
        "o_orderpriority",
        (x % F.lit(HLL_M)).alias("reg"),
        F.shiftright(x, 8).alias("rest"),
    )
    rho = F.when(F.col("rest") == 0, F.lit(HLL_REST_BITS + 1)).otherwise(
        F.lit(HLL_REST_BITS + 1) - F.length(F.bin(F.col("rest")))
    )
    regs = (
        hashed.select("o_orderpriority", "reg", rho.alias("rho"))
        .groupBy("o_orderpriority", "reg")
        .agg(F.max("rho").alias("m_j"))
    )
    merged = regs.groupBy("reg").agg(F.max("m_j").alias("m_j"))
    # absent registers fold in arithmetically (see q_sketch_hll_registers)
    est = merged.agg(
        (
            F.sum(F.expr("shiftleft(CAST(1 AS BIGINT), CAST(50 - m_j AS INT))"))
            + (F.lit(HLL_M) - F.count(F.lit(1))) * F.lit(2**50)
        ).alias("int_sum"),
        (F.lit(HLL_M) - F.count(F.lit(1))).cast("long").alias("zero_regs"),
    )
    exact = orders.agg(F.countDistinct("o_custkey").cast("long").alias("exact_union"))
    raw = F.lit(HLL_SCALE) / F.col("int_sum").cast("double")
    corr = F.when(
        (raw <= F.lit(HLL_LC_THRESHOLD)) & (F.col("zero_regs") > 0),
        F.col("lc_est"),
    ).otherwise(raw)
    exact_d = F.col("exact_union").cast("double")
    return (
        est.crossJoin(F.broadcast(exact))
        .join(
            F.broadcast(_lc_lut_df(orders.sparkSession)),
            F.col("zero_regs") == F.col("v"),
            "left",
        )
        .select(
            "exact_union",
            raw.alias("union_est"),
            corr.alias("union_corr_est"),
            ((raw - exact_d) / exact_d * F.lit(100.0)).alias("rel_err_pct"),
            ((corr - exact_d) / exact_d * F.lit(100.0)).alias("rel_err_corr_pct"),
            "zero_regs",
        )
    )
q_sketch_hll_union.__doc__ = q_sketch_hll_union.__doc__ and q_sketch_hll_union.__doc__.format(a=HLL_UNION_A, b=HLL_UNION_B)


def _sql_hll_union() -> str:
    x = _sql_hex_to_int("md5(CAST(o_custkey AS VARCHAR))", 1, 12)
    return f"""
WITH filtered AS (
  SELECT * FROM orders
  WHERE o_orderpriority IN ('{HLL_UNION_A}', '{HLL_UNION_B}')
), hashed AS (
  SELECT o_orderpriority,
         {x} % {HLL_M} AS reg,
         {x} // {HLL_M} AS rest
  FROM filtered
), rho AS (
  SELECT o_orderpriority, reg,
         CASE WHEN rest = 0 THEN {HLL_REST_BITS + 1}
              ELSE {HLL_REST_BITS + 1} - length(bin(rest))
         END AS rho
  FROM hashed
), regs AS (
  SELECT o_orderpriority, reg, MAX(rho) AS m_j FROM rho GROUP BY 1, 2
), merged AS (
  SELECT reg, MAX(m_j) AS m_j FROM regs GROUP BY 1
), est AS (
  SELECT SUM((CAST(1 AS BIGINT) << (50 - m_j)))
           + ({HLL_M} - COUNT(*)) * (CAST(1 AS BIGINT) << 50) AS int_sum,
         CAST({HLL_M} - COUNT(*) AS BIGINT) AS zero_regs
  FROM merged
), exact AS (
  SELECT CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS exact_union FROM filtered
), sel AS (
  SELECT exact_union,
         CAST({HLL_SCALE!r} AS DOUBLE) / CAST(int_sum AS DOUBLE) AS union_est,
         zero_regs, lut.lc_est
  FROM est CROSS JOIN exact
  LEFT JOIN {_sql_lc_lut()} ON lut.v = est.zero_regs
), corr AS (
  SELECT exact_union, union_est, zero_regs,
         CASE WHEN union_est <= CAST({HLL_LC_THRESHOLD!r} AS DOUBLE)
                   AND zero_regs > 0
              THEN lc_est ELSE union_est END AS union_corr_est
  FROM sel
)
SELECT exact_union, union_est, union_corr_est,
       (union_est - CAST(exact_union AS DOUBLE))
         / CAST(exact_union AS DOUBLE) * 100.0 AS rel_err_pct,
       (union_corr_est - CAST(exact_union AS DOUBLE))
         / CAST(exact_union AS DOUBLE) * 100.0 AS rel_err_corr_pct,
       zero_regs
FROM corr
"""


# ---------------------------------------------------------------------------
# KMV (k-minimum-values) distinct sketch — the third cardinality estimator
# ---------------------------------------------------------------------------

KMV_K = 256
KMV_BUCKETS = 64
KMV_HASH_BITS = 48
# (k−1)·2^48 folded in Python: 255·2^48 < 2^56 is exactly representable,
# so both engines divide the identical double (the HLL_SCALE lesson).
KMV_NUM = float((KMV_K - 1) * (1 << KMV_HASH_BITS))


def q_sketch_kmv_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV (k-minimum-values / bottom-k) distinct-customer estimate per
    order priority, next to the exact COUNT(DISTINCT) — the third
    mergeable cardinality sketch beside the register HLL: keep the k
    smallest hash values ever seen; if the k-th smallest normalized hash
    is U(k), the Bar-Yossef et al. (2002) unbiased estimate is
    D̂ = (k−1)/U(k). Unlike HLL it supports set INTERSECTION estimates
    and needs no register math — the sketch is literally a bottom-k set,
    mergeable by union+truncate.

    Distributed shape (the tournament top-k, not a global sort): distinct
    (group, hash) pairs → per (group, hash%{KMV_BUCKETS}) bottom-k via a
    {KMV_BUCKETS}-way-parallel window → the ≤ {KMV_BUCKETS}·k survivors
    per group meet in one tiny final window. At 100 TB every data-sized
    stage is a hash agg or a bucketed window; the single-key final pass
    sees ≤ 16k rows per group. Hash = 48-bit md5 prefix (identical
    literal math on both engines); the estimate's only float op is ONE
    division of Python-folded (k−1)·2^48 by the integer k-th hash. When
    a group has fewer than k distinct hashes the sketch IS the exact set
    and the estimator falls back to its size (the standard convention).
    ``rel_err_pct`` is gate-checked beside the exact baseline."""
    from pyspark.sql import Window

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderpriority", "o_custkey"
    )
    h = F.conv(
        F.substring(F.md5(F.col("o_custkey").cast("string")), 1, 12), 16, 10
    ).cast("bigint")
    pairs = orders.select("o_orderpriority", h.alias("h")).distinct()
    exact = orders.groupBy("o_orderpriority").agg(
        F.countDistinct("o_custkey").alias("n_exact")
    )
    w_bucket = Window.partitionBy(
        "o_orderpriority", F.col("h") % KMV_BUCKETS
    ).orderBy("h")
    cand = pairs.withColumn("_rb", F.row_number().over(w_bucket)).filter(
        F.col("_rb") <= KMV_K
    )
    w_final = Window.partitionBy("o_orderpriority").orderBy("h")
    top = cand.withColumn("_rn", F.row_number().over(w_final)).filter(
        F.col("_rn") <= KMV_K
    )
    stats = top.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).cast("long").alias("n_cand"),
        F.max(F.when(F.col("_rn") == KMV_K, F.col("h"))).alias("u_k"),
    )
    est = F.when(
        F.col("n_cand") < KMV_K, F.col("n_cand").cast("double")
    ).otherwise(F.lit(KMV_NUM) / F.col("u_k").cast("double"))
    out = exact.join(F.broadcast(stats), "o_orderpriority")
    return out.select(
        "o_orderpriority",
        "n_exact",
        "n_cand",
        est.alias("kmv_est"),
        (
            F.abs(est - F.col("n_exact").cast("double"))
            / F.col("n_exact").cast("double")
            * F.lit(100.0)
        ).alias("rel_err_pct"),
    ).orderBy("o_orderpriority")


q_sketch_kmv_distinct.__doc__ = q_sketch_kmv_distinct.__doc__ and q_sketch_kmv_distinct.__doc__.replace(
    "{KMV_BUCKETS}", str(KMV_BUCKETS)
)


def _sql_kmv() -> str:
    h = _sql_hex_to_int("md5(CAST(o_custkey AS VARCHAR))", 1, 12)
    return f"""
WITH pairs AS (
  SELECT DISTINCT o_orderpriority, {h} AS h FROM orders
), exact AS (
  SELECT o_orderpriority, CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_exact
  FROM orders GROUP BY 1
), ranked AS (
  SELECT o_orderpriority, h,
         ROW_NUMBER() OVER (PARTITION BY o_orderpriority ORDER BY h) AS rn
  FROM pairs
), stats AS (
  SELECT o_orderpriority,
         CAST(COUNT(*) AS BIGINT) AS n_cand,
         MAX(CASE WHEN rn = {KMV_K} THEN h END) AS u_k
  FROM ranked WHERE rn <= {KMV_K} GROUP BY 1
), scored AS (
  SELECT e.o_orderpriority, e.n_exact, s.n_cand,
         CASE WHEN s.n_cand < {KMV_K} THEN CAST(s.n_cand AS DOUBLE)
              ELSE CAST({KMV_NUM!r} AS DOUBLE) / CAST(s.u_k AS DOUBLE) END AS kmv_est
  FROM exact e JOIN stats s USING (o_orderpriority)
)
SELECT o_orderpriority, n_exact, n_cand, kmv_est,
       ABS(kmv_est - CAST(n_exact AS DOUBLE)) / CAST(n_exact AS DOUBLE) * 100.0
         AS rel_err_pct
FROM scored
ORDER BY o_orderpriority
"""


# ---------------------------------------------------------------------------
# Count-Sketch (signed CMS): unbiased frequency estimates, median-of-d
# ---------------------------------------------------------------------------

CS_P = 2147483647  # 2^31 - 1
CS_W = 256
# d = 5 rows; per row: (a, b) bucket-hash affine pair + (c, e) sign pair
CS_COEF = [
    (131071, 8191, 97, 41),
    (524287, 127, 193, 67),
    (6700417, 2047, 389, 101),
    (2147483629, 524287, 769, 151),
    (65537, 4099, 1543, 211),
]
CS_TOPK = 10


def q_sketch_countsketch_freq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Sketch frequency estimates for the top-K order customers —
    the SIGNED sibling of ``sketch_cms_freq``: each of d=5 rows hashes the
    key to one of {w} buckets AND to a ±1 sign, the cell accumulates
    sign·1, and the estimate is the MEDIAN over rows of sign(k)·cell —
    unbiased (collisions cancel in expectation) where CMS only
    over-counts; the error column here is two-sided by design, which the
    gate exhibits cross-engine. The median of 5 exact integers is taken
    by sorting the 5-element array and picking the middle — no
    percentile interpolation, integer-exact on both engines.

    Scale shape: identical to CMS — data touched once (explode ×d) into a
    d·w = 1280-cell map-side-combinable aggregate; probes join K keys
    against the broadcast sketch. The sketch is the ONLY state that
    crosses the wire at 100 TB."""
    orders = load_table(spark, sf_dir, "orders").select("o_custkey")

    def bucket(j_a, j_b):
        return ((F.col("o_custkey") * F.lit(j_a) + F.lit(j_b)) % F.lit(CS_P)) % F.lit(
            CS_W
        )

    def sign(j_c, j_e):
        return (
            ((F.col("o_custkey") * F.lit(j_c) + F.lit(j_e)) % F.lit(CS_P)) % F.lit(2)
        ) * F.lit(2) - F.lit(1)

    cells = None
    for j, (a, b, c, e) in enumerate(CS_COEF):
        part = orders.select(
            F.lit(j).alias("j"), bucket(a, b).alias("bucket"), sign(c, e).alias("sgn")
        )
        cells = part if cells is None else cells.unionAll(part)
    sketch = cells.groupBy("j", "bucket").agg(
        F.sum("sgn").cast("long").alias("cell")
    )

    exact = orders.groupBy("o_custkey").agg(F.count(F.lit(1)).alias("exact_cnt"))
    probe = exact.orderBy(F.col("exact_cnt").desc(), F.col("o_custkey").asc()).limit(
        CS_TOPK
    )
    probed = None
    for j, (a, b, c, e) in enumerate(CS_COEF):
        leg = probe.select(
            "o_custkey",
            "exact_cnt",
            F.lit(j).alias("j"),
            bucket(a, b).alias("bucket"),
            sign(c, e).alias("sgn"),
        )
        probed = leg if probed is None else probed.unionAll(leg)
    ests = probed.join(F.broadcast(sketch), ["j", "bucket"]).select(
        "o_custkey", "exact_cnt", (F.col("sgn") * F.col("cell")).alias("est")
    )
    out = ests.groupBy("o_custkey", "exact_cnt").agg(
        F.expr("element_at(array_sort(collect_list(est)), 3)").alias("cs_est")
    )
    return out.select(
        "o_custkey",
        F.col("exact_cnt").cast("long").alias("exact_cnt"),
        F.col("cs_est").cast("long").alias("cs_est"),
        (F.col("cs_est") - F.col("exact_cnt")).cast("long").alias("error"),
    ).orderBy(F.col("exact_cnt").desc(), F.col("o_custkey").asc())
q_sketch_countsketch_freq.__doc__ = q_sketch_countsketch_freq.__doc__ and q_sketch_countsketch_freq.__doc__.format(w=CS_W)


def _sql_countsketch() -> str:
    legs = " UNION ALL ".join(
        f"SELECT {j} AS j,"
        f" ((o_custkey * {a} + {b}) % {CS_P}) % {CS_W} AS bucket,"
        f" (((o_custkey * {c} + {e}) % {CS_P}) % 2) * 2 - 1 AS sgn"
        " FROM orders"
        for j, (a, b, c, e) in enumerate(CS_COEF)
    )
    probe_legs = " UNION ALL ".join(
        f"SELECT o_custkey, exact_cnt, {j} AS j,"
        f" ((o_custkey * {a} + {b}) % {CS_P}) % {CS_W} AS bucket,"
        f" (((o_custkey * {c} + {e}) % {CS_P}) % 2) * 2 - 1 AS sgn"
        " FROM probe"
        for j, (a, b, c, e) in enumerate(CS_COEF)
    )
    return f"""
WITH cells AS ({legs}),
sketch AS (SELECT j, bucket, CAST(SUM(sgn) AS BIGINT) AS cell FROM cells GROUP BY j, bucket),
exact AS (SELECT o_custkey, COUNT(*) AS exact_cnt FROM orders GROUP BY o_custkey),
probe AS (SELECT * FROM exact ORDER BY exact_cnt DESC, o_custkey ASC LIMIT {CS_TOPK}),
probed AS ({probe_legs}),
ests AS (
  SELECT p.o_custkey, p.exact_cnt, p.sgn * s.cell AS est
  FROM probed p JOIN sketch s USING (j, bucket)
),
med AS (
  SELECT o_custkey, exact_cnt, (list_sort(list(est)))[3] AS cs_est
  FROM ests GROUP BY o_custkey, exact_cnt
)
SELECT o_custkey, CAST(exact_cnt AS BIGINT) AS exact_cnt,
       CAST(cs_est AS BIGINT) AS cs_est,
       CAST(cs_est - exact_cnt AS BIGINT) AS error
FROM med
ORDER BY exact_cnt DESC, o_custkey ASC
"""


# ---------------------------------------------------------------------------
# Theta-sketch set intersection: the operation HLL cannot do
# ---------------------------------------------------------------------------

THETA_K = 256
THETA_FULL = 1 << KMV_HASH_BITS  # theta when the sample IS the exact set


def q_sketch_theta_intersection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theta-sketch INTERSECTION estimate |A∩B| for two customer sets —
    A = customers with a 1-URGENT order, B = customers with a 2-HIGH
    order — next to the exact overlap. This is the set operation the
    register HLL fundamentally cannot provide (inclusion–exclusion on
    HLL unions explodes the error when the overlap is small); a theta
    sketch is a uniform hash sample below a threshold θ, so ANY set
    expression evaluates sample-side: keep each set's k smallest hashes,
    take θ = min(θ_A, θ_B), and count common hashes below θ — the
    estimate is count·2^48/θ, one division on exact integers.

    Scale shape: per set the bottom-k is the ``sketch_kmv_distinct``
    tournament (bucketed windows, ≤ {b}·k survivors per group meet in
    one tiny final pass); the intersection probe joins two ≤{k}-row
    broadcast sketches. A group with < k distinct hashes keeps θ = 2^48
    (its sample is the exact set — the standard exact-mode
    convention)."""
    from pyspark.sql import Window

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderpriority", "o_custkey"
    )
    h = F.conv(
        F.substring(F.md5(F.col("o_custkey").cast("string")), 1, 12), 16, 10
    ).cast("bigint")

    def kmv(pred):
        pairs = orders.filter(pred).select(h.alias("h")).distinct()
        w_bucket = Window.partitionBy(F.col("h") % KMV_BUCKETS).orderBy("h")
        cand = pairs.withColumn("_rb", F.row_number().over(w_bucket)).filter(
            F.col("_rb") <= THETA_K
        )
        w_final = Window.orderBy("h")
        return (
            cand.withColumn("_rn", F.row_number().over(w_final))
            .filter(F.col("_rn") <= THETA_K)
            .select("h", "_rn")
        )

    ka = kmv(F.col("o_orderpriority") == "1-URGENT")
    kb = kmv(F.col("o_orderpriority") == "2-HIGH")

    def theta(kset):
        return kset.agg(
            F.when(F.count(F.lit(1)) < THETA_K, F.lit(THETA_FULL))
            .otherwise(F.max(F.when(F.col("_rn") == THETA_K, F.col("h"))))
            .alias("th")
        )

    th = (
        theta(ka)
        .crossJoin(theta(kb).withColumnRenamed("th", "th_b"))
        .select(F.least("th", "th_b").alias("theta"))
    )
    common = (
        ka.select("h")
        .join(kb.select("h"), "h")
        .crossJoin(F.broadcast(th))
        .filter(F.col("h") < F.col("theta"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_common"),
            F.max("theta").alias("theta"),
        )
    )
    exact = (
        orders.filter(F.col("o_orderpriority") == "1-URGENT")
        .select("o_custkey")
        .distinct()
        .join(
            orders.filter(F.col("o_orderpriority") == "2-HIGH")
            .select("o_custkey")
            .distinct(),
            "o_custkey",
        )
        .agg(F.count(F.lit(1)).cast("long").alias("exact_inter"))
    )
    est = F.col("n_common").cast("double") * F.lit(float(THETA_FULL)) / F.col(
        "theta"
    ).cast("double")
    exact_d = F.col("exact_inter").cast("double")
    return (
        common.crossJoin(F.broadcast(exact))
        .select(
            "exact_inter",
            "n_common",
            F.col("theta").cast("long").alias("theta"),
            est.alias("theta_est"),
            ((est - exact_d) / exact_d * F.lit(100.0)).alias("rel_err_pct"),
        )
    )
q_sketch_theta_intersection.__doc__ = q_sketch_theta_intersection.__doc__ and q_sketch_theta_intersection.__doc__.format(b=KMV_BUCKETS, k=THETA_K)


def _sql_theta_intersection() -> str:
    hx = _sql_hex_to_int("md5(CAST(o_custkey AS VARCHAR))", 1, 12)

    def kmv_sql(prio, name):
        return f"""{name}_pairs AS (
  SELECT DISTINCT {hx} AS h FROM orders WHERE o_orderpriority = '{prio}'
), {name} AS (
  SELECT h, ROW_NUMBER() OVER (ORDER BY h) AS rn
  FROM {name}_pairs
  QUALIFY rn <= {THETA_K}
), {name}_theta AS (
  SELECT CASE WHEN COUNT(*) < {THETA_K} THEN {THETA_FULL}
              ELSE MAX(CASE WHEN rn = {THETA_K} THEN h END) END AS th
  FROM {name}
)"""

    return f"""
WITH {kmv_sql('1-URGENT', 'ka')}, {kmv_sql('2-HIGH', 'kb')},
th AS (
  SELECT LEAST(ka_theta.th, kb_theta.th) AS theta
  FROM ka_theta CROSS JOIN kb_theta
), common AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_common, MAX(theta) AS theta
  FROM ka JOIN kb USING (h) CROSS JOIN th
  WHERE ka.h < theta
), exact AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS exact_inter FROM (
    SELECT DISTINCT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
    INTERSECT
    SELECT DISTINCT o_custkey FROM orders WHERE o_orderpriority = '2-HIGH'
  )
)
SELECT exact_inter, n_common, CAST(theta AS BIGINT) AS theta,
       CAST(n_common AS DOUBLE) * CAST({float(THETA_FULL)!r} AS DOUBLE)
         / CAST(theta AS DOUBLE) AS theta_est,
       (CAST(n_common AS DOUBLE) * CAST({float(THETA_FULL)!r} AS DOUBLE)
         / CAST(theta AS DOUBLE) - CAST(exact_inter AS DOUBLE))
         / CAST(exact_inter AS DOUBLE) * 100.0 AS rel_err_pct
FROM common CROSS JOIN exact
"""


# ---------------------------------------------------------------------------
# Theta-sketch A-not-B: the set-difference companion of the intersection
# ---------------------------------------------------------------------------


def q_sketch_theta_difference(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theta-sketch A-NOT-B estimate |A \\ B| — customers who placed a
    1-URGENT order but never a 2-HIGH one — beside the exact difference.
    Completes the theta set algebra next to ``sketch_theta_intersection``
    (the Apache DataSketches AnotB operation): with θ = min(θ_A, θ_B),
    B's bottom-k sample contains EVERY hash of B below θ, so an A-sample
    hash below θ absent from B's sample is genuinely absent from B — an
    ANTI-join of two ≤k-row sketches, estimate = count·2^48/θ on exact
    integers with one final division.

    Scale shape: identical to the intersection entry — two KMV bottom-k
    tournaments (bucketed windows), a broadcast anti-join of two tiny
    samples, and the exact-mode collapse (θ = 2^48) when a set fits in
    k. The exact baseline is one distinct + left-anti + count."""
    from pyspark.sql import Window

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderpriority", "o_custkey"
    )
    h = F.conv(
        F.substring(F.md5(F.col("o_custkey").cast("string")), 1, 12), 16, 10
    ).cast("bigint")

    def kmv(pred):
        pairs = orders.filter(pred).select(h.alias("h")).distinct()
        w_bucket = Window.partitionBy(F.col("h") % KMV_BUCKETS).orderBy("h")
        cand = pairs.withColumn("_rb", F.row_number().over(w_bucket)).filter(
            F.col("_rb") <= THETA_K
        )
        w_final = Window.orderBy("h")
        return (
            cand.withColumn("_rn", F.row_number().over(w_final))
            .filter(F.col("_rn") <= THETA_K)
            .select("h", "_rn")
        )

    ka = kmv(F.col("o_orderpriority") == "1-URGENT")
    kb = kmv(F.col("o_orderpriority") == "2-HIGH")

    def theta(kset):
        return kset.agg(
            F.when(F.count(F.lit(1)) < THETA_K, F.lit(THETA_FULL))
            .otherwise(F.max(F.when(F.col("_rn") == THETA_K, F.col("h"))))
            .alias("th")
        )

    th = (
        theta(ka)
        .crossJoin(theta(kb).withColumnRenamed("th", "th_b"))
        .select(F.least("th", "th_b").alias("theta"))
    )
    only_a = (
        ka.select("h")
        .join(kb.select("h"), "h", "left_anti")
        .crossJoin(F.broadcast(th))
        .filter(F.col("h") < F.col("theta"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_only"),
            F.max("theta").alias("theta"),
        )
    )
    exact = (
        orders.filter(F.col("o_orderpriority") == "1-URGENT")
        .select("o_custkey")
        .distinct()
        .join(
            orders.filter(F.col("o_orderpriority") == "2-HIGH")
            .select("o_custkey")
            .distinct(),
            "o_custkey",
            "left_anti",
        )
        .agg(F.count(F.lit(1)).cast("long").alias("exact_diff"))
    )
    est = F.col("n_only").cast("double") * F.lit(float(THETA_FULL)) / F.col(
        "theta"
    ).cast("double")
    exact_d = F.col("exact_diff").cast("double")
    return only_a.crossJoin(F.broadcast(exact)).select(
        "exact_diff",
        "n_only",
        F.col("theta").cast("long").alias("theta"),
        est.alias("theta_est"),
        ((est - exact_d) / exact_d * F.lit(100.0)).alias("rel_err_pct"),
    )


def _sql_theta_difference() -> str:
    hx = _sql_hex_to_int("md5(CAST(o_custkey AS VARCHAR))", 1, 12)

    def kmv_sql(prio, name):
        return f"""{name}_pairs AS (
  SELECT DISTINCT {hx} AS h FROM orders WHERE o_orderpriority = '{prio}'
), {name} AS (
  SELECT h, ROW_NUMBER() OVER (ORDER BY h) AS rn
  FROM {name}_pairs
  QUALIFY rn <= {THETA_K}
), {name}_theta AS (
  SELECT CASE WHEN COUNT(*) < {THETA_K} THEN {THETA_FULL}
              ELSE MAX(CASE WHEN rn = {THETA_K} THEN h END) END AS th
  FROM {name}
)"""

    return f"""
WITH {kmv_sql('1-URGENT', 'ka')}, {kmv_sql('2-HIGH', 'kb')},
th AS (
  SELECT LEAST(ka_theta.th, kb_theta.th) AS theta
  FROM ka_theta CROSS JOIN kb_theta
), only_a AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_only, MAX(theta) AS theta
  FROM ka CROSS JOIN th
  WHERE ka.h < theta AND NOT EXISTS (SELECT 1 FROM kb WHERE kb.h = ka.h)
), exact AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS exact_diff FROM (
    SELECT DISTINCT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
    EXCEPT
    SELECT DISTINCT o_custkey FROM orders WHERE o_orderpriority = '2-HIGH'
  )
)
SELECT exact_diff, n_only, CAST(theta AS BIGINT) AS theta,
       CAST(n_only AS DOUBLE) * CAST({float(THETA_FULL)!r} AS DOUBLE)
         / CAST(theta AS DOUBLE) AS theta_est,
       (CAST(n_only AS DOUBLE) * CAST({float(THETA_FULL)!r} AS DOUBLE)
         / CAST(theta AS DOUBLE) - CAST(exact_diff AS DOUBLE))
         / CAST(exact_diff AS DOUBLE) * 100.0 AS rel_err_pct
FROM only_a CROSS JOIN exact
"""


# ---------------------------------------------------------------------------
# Bloom filter build + measured false-positive rate (round 13)
# ---------------------------------------------------------------------------

BLOOM_M = 4096  # filter bits (literal — the sketch is the state, not the data)
BLOOM_K = 3  # hash functions


def q_sketch_bloom_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom filter built over one key population and probed with a
    DISJOINT one, reporting the MEASURED false-positive rate next to
    the bit occupancy — the membership sketch beside the cardinality
    (HLL/KMV/theta) and frequency (CMS/CountSketch) families, and the
    semantics behind ``bloom_semi_join``'s runtime filter, here
    materialized as inspectable state: insert the BUILDING-segment
    customer keys (m = 4096 bits, k = 3), probe with the MACHINERY
    keys (segments partition customers, so every probe hit is a false
    positive by construction — the measured FPP needs no ground-truth
    join).

    ZERO-RNG determinism: hash j of key x is the module's portable
    48-bit md5 integer of x||'#'||j, reduced mod m — identical bit
    positions on both engines; the filter is the DISTINCT position set
    (bits_set = its size); a probe is positive iff ALL k of its
    positions are set (semi-join on position, per-key matched-distinct
    count = k). Every output is exact integer algebra plus two single
    divisions (occupancy, measured FPP). No theoretical FPP column —
    (1−e^{{−kn/m}})^k is transcendental; the measured rate IS the
    deliverable. Degenerate contract: zero probes → FPP NULL.

    Scale shape: one dim scan per side, a ≤m-row DISTINCT bit set
    (broadcast), one semi-join + per-key count — the filter state is
    O(m) regardless of data size, which is the point of a Bloom
    filter at 100 TB.

    Reference analog: none (engine addition, SURVEY.md §2.7)."""
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment"
    )

    def positions(df):
        pos = []
        for j in range(BLOOM_K):
            h = F.conv(
                F.substring(
                    F.md5(
                        F.concat(
                            F.col("c_custkey").cast("string"),
                            F.lit(f"#{j}"),
                        )
                    ),
                    1,
                    12,
                ),
                16,
                10,
            ).cast("long")
            pos.append((h % BLOOM_M).alias(f"pos{j}"))
        return df.select("c_custkey", *pos)

    ins = positions(cust.filter(F.col("c_mktsegment") == "BUILDING"))
    probes = positions(cust.filter(F.col("c_mktsegment") == "MACHINERY"))
    bits = (
        ins.selectExpr("explode(array(pos0, pos1, pos2)) AS pos")
        .distinct()
    )
    n_ins = ins.agg(F.countDistinct("c_custkey").cast("long").alias("n_inserted"))
    n_bits = bits.agg(F.count(F.lit(1)).cast("long").alias("bits_set"))
    probe_pos = probes.selectExpr(
        "c_custkey", "explode(array(pos0, pos1, pos2)) AS pos"
    )
    hits = (
        probe_pos.join(F.broadcast(bits), "pos")
        .groupBy("c_custkey")
        .agg(F.countDistinct("pos").alias("n_hit"))
    )
    per_probe = probes.join(hits, "c_custkey", "left").select(
        "c_custkey",
        F.coalesce(F.col("n_hit"), F.lit(0)).alias("n_hit"),
        F.size(F.array_distinct(F.array("pos0", "pos1", "pos2"))).alias("n_pos"),
    )
    red = per_probe.agg(
        F.count(F.lit(1)).cast("long").alias("n_probes"),
        F.sum((F.col("n_hit") == F.col("n_pos")).cast("long"))
        .cast("long")
        .alias("n_false_positive"),
    )
    out = red.crossJoin(F.broadcast(n_ins)).crossJoin(F.broadcast(n_bits))
    ok = F.col("n_probes") > 0
    return out.select(
        F.lit(BLOOM_M).cast("int").alias("m_bits"),
        F.lit(BLOOM_K).cast("int").alias("k_hashes"),
        "n_inserted",
        "bits_set",
        (F.col("bits_set").cast("double") / F.lit(float(BLOOM_M))).alias(
            "occupancy"
        ),
        "n_probes",
        "n_false_positive",
        F.when(
            ok,
            F.col("n_false_positive").cast("double")
            / F.col("n_probes").cast("double"),
        ).alias("measured_fpp"),
    )


def _sql_bloom() -> str:
    def pos(j):
        h = _sql_hex_to_int(f"md5(CAST(c_custkey AS VARCHAR) || '#{j}')", 1, 12)
        return f"({h} % {BLOOM_M})"

    pos_cols = ", ".join(f"{pos(j)} AS pos{j}" for j in range(BLOOM_K))
    return f"""
WITH ins AS (
  SELECT c_custkey, {pos_cols}
  FROM customer WHERE c_mktsegment = 'BUILDING'
), probes AS (
  SELECT c_custkey, {pos_cols}
  FROM customer WHERE c_mktsegment = 'MACHINERY'
), bits AS (
  SELECT DISTINCT pos FROM (
    SELECT UNNEST([pos0, pos1, pos2]) AS pos FROM ins
  )
), n_ins AS (SELECT CAST(COUNT(DISTINCT c_custkey) AS BIGINT) AS n_inserted FROM ins),
n_bits AS (SELECT CAST(COUNT(*) AS BIGINT) AS bits_set FROM bits),
probe_pos AS (
  SELECT c_custkey, UNNEST([pos0, pos1, pos2]) AS pos FROM probes
), hits AS (
  SELECT p.c_custkey, COUNT(DISTINCT p.pos) AS n_hit
  FROM probe_pos p JOIN bits b ON p.pos = b.pos
  GROUP BY 1
), per_probe AS (
  SELECT pr.c_custkey,
         COALESCE(h.n_hit, 0) AS n_hit,
         len(list_distinct([pos0, pos1, pos2])) AS n_pos
  FROM probes pr LEFT JOIN hits h ON pr.c_custkey = h.c_custkey
), red AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_probes,
         CAST(SUM(CASE WHEN n_hit = n_pos THEN 1 ELSE 0 END) AS BIGINT) AS n_false_positive
  FROM per_probe
)
SELECT CAST({BLOOM_M} AS INT) AS m_bits,
       CAST({BLOOM_K} AS INT) AS k_hashes,
       n_inserted, bits_set,
       CAST(bits_set AS DOUBLE) / {float(BLOOM_M)!r} AS occupancy,
       n_probes, n_false_positive,
       CASE WHEN n_probes > 0
            THEN CAST(n_false_positive AS DOUBLE) / CAST(n_probes AS DOUBLE)
       END AS measured_fpp
FROM red CROSS JOIN n_ins CROSS JOIN n_bits
"""


# ---------------------------------------------------------------------------
# DDSketch relative-error quantiles (round 14)
# ---------------------------------------------------------------------------

DDS_SUB = 8                 # sub-buckets per octave: gamma = 2^(1/8)
DDS_GAMMA = 2.0 ** (1.0 / DDS_SUB)
DDS_ALPHA = (DDS_GAMMA - 1.0) / (DDS_GAMMA + 1.0)  # ≈ 4.4% relative error
DDS_MID = 2.0 / (1.0 + DDS_GAMMA)  # bucket-midpoint factor: est = mid·gamma^i
DDS_K_MAX = 45              # supported value range: [1, 2^46) integer cents
DDS_QS = [0.5, 0.95, 0.99]  # literal quantiles reported
# literal sub-bucket thresholds 2^(j/8), j = 1..7 (m in [1,2) compares here)
_DDS_THRESH = [2.0 ** (j / DDS_SUB) for j in range(1, DDS_SUB)]
# literal reconstruction factors 2^(r/8), r = 0..7
_DDS_FRAC = [2.0 ** (r / DDS_SUB) for r in range(DDS_SUB)]


def q_sketch_ddsketch_quantile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DDSketch quantiles of order value (Masson, Rim & Lee, VLDB 2019):
    values hash to logarithmic buckets γ^(i−1) < x ≤ γ^i at the literal
    γ = 2^(1/{s}), so ANY quantile reconstructs within the α ≈ {a:.3f}
    RELATIVE-error guarantee — the property rank-error sketches
    (``sketch_histogram_quantile``'s equi-width bins,
    percentile_approx's GK family) cannot give: a p99 of $400k and a
    p50 of $900 are BOTH within 4.4% of truth from the same tiny
    sketch, and sketches merge by bucket-count addition (map-side
    combinable by construction).

    Spark-first exactness: because γ is a power-of-two root, the bucket
    index needs NO logarithm — i = {s}·k + r with k = floor(log₂ x)
    from a literal power-of-two comparison CASE (x < 2^{km}, enforced
    by guard) and r from {s1} literal mantissa thresholds 2^(j/{s})
    (the mantissa x·2^(−k) is an EXACT scaling); reconstruction
    γ^i = 2^(i DIV {s})·2^((i MOD {s})/{s}) is likewise two literal
    lookups times the literal midpoint factor 2/(1+γ). Every count is
    an exact integer; both engines evaluate identical literal CASEs —
    bit-equal end to end, no transcendental anywhere. Degenerate
    contract: an empty table → no rows; out-of-range values NULL the
    affected quantile via the k-CASE guard (surfaced, not clamped).

    Scale shape: one narrow map (two CASEs) + one |buckets| hash agg
    (≤ {s}·{km} cells) + cumulative window and quantile picks on the
    bucket frame. At 100 TB the sketch is still ≤ 360 rows.

    Reference analog: none (engine addition, SURVEY.md §2.7)."""
    orders = load_table(spark, sf_dir, "orders").select(
        F.round(F.col("o_totalprice") * 100, 0).cast("bigint").alias("x")
    )
    k_expr = None
    m_expr = None
    for k in range(DDS_K_MAX, -1, -1):
        cond = F.col("x") >= F.lit(2**k)
        k_expr = F.when(cond, F.lit(k)) if k_expr is None else k_expr.when(cond, F.lit(k))
        m_expr = (
            F.when(cond, F.col("x").cast("double") * F.lit(2.0**-k))
            if m_expr is None
            else m_expr.when(cond, F.col("x").cast("double") * F.lit(2.0**-k))
        )
    staged = orders.filter(F.col("x") > 0).select(
        k_expr.alias("k"), m_expr.alias("m")
    )
    r_expr = F.when(F.col("m") <= 1.0, F.lit(0))
    for j, t in enumerate(_DDS_THRESH, start=1):
        r_expr = r_expr.when(F.col("m") <= F.lit(t), F.lit(j))
    r_expr = r_expr.otherwise(F.lit(DDS_SUB))
    idx = (F.col("k") * DDS_SUB + r_expr).alias("idx")
    buckets = staged.select(idx).groupBy("idx").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    tot = buckets.agg(
        F.sum("c").cast("long").alias("n"),
        F.count(F.lit(1)).cast("long").alias("n_buckets"),
    )
    w = Window.orderBy("idx").rowsBetween(Window.unboundedPreceding, 0)
    cum = buckets.select("idx", F.sum("c").over(w).cast("long").alias("cum"))
    qs = spark.createDataFrame(
        [(float(q),) for q in DDS_QS], "q double"
    )
    picked = (
        qs.crossJoin(F.broadcast(tot))
        .join(
            cum,
            cum["cum"]
            >= F.ceil(F.col("q") * F.col("n").cast("double")).cast("long"),
        )
        .groupBy("q", "n", "n_buckets")
        .agg(F.min("idx").cast("long").alias("bucket_idx"))
    )
    k2 = F.col("bucket_idx") % DDS_SUB  # reconstruction split
    pow2 = None
    for k in range(DDS_K_MAX + 1, -1, -1):
        cond = (F.col("bucket_idx") - k2) / DDS_SUB == F.lit(k)
        pow2 = (
            F.when(cond, F.lit(2.0**k)) if pow2 is None else pow2.when(cond, F.lit(2.0**k))
        )
    frac = None
    for r, fval in enumerate(_DDS_FRAC):
        c = k2 == F.lit(r)
        frac = F.when(c, F.lit(fval)) if frac is None else frac.when(c, F.lit(fval))
    est_cents = pow2 * frac * F.lit(DDS_MID)
    return picked.select(
        "q",
        "n",
        "n_buckets",
        "bucket_idx",
        (est_cents / F.lit(100.0)).alias("est_value_dollars"),
        F.lit(DDS_ALPHA).alias("rel_error_bound"),
    ).orderBy("q")


q_sketch_ddsketch_quantile.__doc__ = q_sketch_ddsketch_quantile.__doc__ and (
    q_sketch_ddsketch_quantile.__doc__.format(
        s=DDS_SUB, s1=DDS_SUB - 1, a=DDS_ALPHA, km=DDS_K_MAX + 1
    )
)


def _sql_ddsketch() -> str:
    k_branches = " ".join(
        f"WHEN x >= {2**k} THEN {k}" for k in range(DDS_K_MAX, -1, -1)
    )
    m_branches = " ".join(
        f"WHEN x >= {2**k} THEN CAST(x AS DOUBLE) * {2.0**-k!r}"
        for k in range(DDS_K_MAX, -1, -1)
    )
    r_branches = "WHEN m <= 1.0 THEN 0 " + " ".join(
        f"WHEN m <= CAST('{t!r}' AS DOUBLE) THEN {j}"
        for j, t in enumerate(_DDS_THRESH, start=1)
    )
    pow_branches = " ".join(
        f"WHEN (bucket_idx - bucket_idx % {DDS_SUB}) / {DDS_SUB} = {k} THEN {2.0**k!r}"
        for k in range(DDS_K_MAX + 1, -1, -1)
    )
    frac_branches = " ".join(
        f"WHEN bucket_idx % {DDS_SUB} = {r} THEN CAST('{fv!r}' AS DOUBLE)"
        for r, fv in enumerate(_DDS_FRAC)
    )
    qvals = ", ".join(f"({q!r})" for q in DDS_QS)
    return f"""
WITH vals AS (
  SELECT CAST(ROUND(o_totalprice * 100) AS BIGINT) AS x FROM orders
), staged AS (
  SELECT CASE {k_branches} END AS k,
         CASE {m_branches} END AS m
  FROM vals WHERE x > 0
), buckets AS (
  SELECT k * {DDS_SUB} + (CASE {r_branches} ELSE {DDS_SUB} END) AS idx,
         CAST(COUNT(*) AS BIGINT) AS c
  FROM staged GROUP BY 1
), tot AS (
  SELECT CAST(SUM(c) AS BIGINT) AS n, CAST(COUNT(*) AS BIGINT) AS n_buckets
  FROM buckets
), cum AS (
  SELECT idx, CAST(SUM(c) OVER (ORDER BY idx
       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
  FROM buckets
), qs AS (SELECT CAST(UNNEST([{qvals}]) AS DOUBLE) AS q),
picked AS (
  SELECT q, n, n_buckets, CAST(MIN(idx) AS BIGINT) AS bucket_idx
  FROM qs CROSS JOIN tot
  JOIN cum ON cum.cum >= CAST(CEIL(q * CAST(n AS DOUBLE)) AS BIGINT)
  GROUP BY 1, 2, 3
)
SELECT q, n, n_buckets, bucket_idx,
       (CASE {pow_branches} END)
       * (CASE {frac_branches} END)
       * CAST('{DDS_MID!r}' AS DOUBLE) / 100.0 AS est_value_dollars,
       CAST('{DDS_ALPHA!r}' AS DOUBLE) AS rel_error_bound
FROM picked
ORDER BY q
"""


QUERIES = {
    "sketch_ddsketch_quantile": q_sketch_ddsketch_quantile,
    "sketch_bloom_filter": q_sketch_bloom_filter,
    "sketch_theta_difference": q_sketch_theta_difference,
    "sketch_cms_freq": q_sketch_cms_freq,
    "sketch_kmv_distinct": q_sketch_kmv_distinct,
    "sketch_hll_registers": q_sketch_hll_registers,
    "sketch_histogram_quantile": q_sketch_histogram_quantile,
    "sketch_hll_union": q_sketch_hll_union,
    "sketch_countsketch_freq": q_sketch_countsketch_freq,
    "sketch_theta_intersection": q_sketch_theta_intersection,
}

ORACLE = {
    "sketch_ddsketch_quantile": _sql_ddsketch(),
    "sketch_bloom_filter": _sql_bloom(),
    "sketch_cms_freq": _sql_cms(),
    "sketch_hll_registers": _sql_hll(),
    "sketch_histogram_quantile": _sql_histq(),
    "sketch_hll_union": _sql_hll_union(),
    "sketch_kmv_distinct": _sql_kmv(),
    "sketch_countsketch_freq": _sql_countsketch(),
    "sketch_theta_intersection": _sql_theta_intersection(),
    "sketch_theta_difference": _sql_theta_difference(),
}
