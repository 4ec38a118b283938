"""Data-quality audit: constraint checking as a first-class engine operator.

The reference relies on MySQL DDL constraints (PRIMARY KEY on the star dims,
`sql/data_modeling.sql`) to fail loudly on bad data; a lakehouse has no
enforced constraints, so the engine must *measure* them. This operator runs
the standard audit suite — key uniqueness, referential integrity, domain
ranges, null/blank rates — and returns one row per check with violation
counts, the shape a nightly data-contract job alerts on.

Scale shape: each check is a full-scan aggregate with map-side combine
(bytes, not rows, shuffle); the referential-integrity check is a left anti
join on the foreign key (sort-merge at 100 TB, broadcast when the parent
side is dimension-sized). The checks union into one result after each has
already been reduced to a single row, so the union is free. No check
collects or iterates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from us_flight_bigdata_dashboard_spark.operators.statistics import _CUM_BUCKETS, _cum_prev
from us_flight_bigdata_dashboard_spark.sources.catalog import load_table

QTY_LO, QTY_HI = 1.0, 50.0


def _check(df: DataFrame, name: str, violation) -> DataFrame:
    return df.agg(
        F.lit(name).alias("check_name"),
        F.count(F.lit(1)).alias("n_checked"),
        F.sum(F.when(violation, 1).otherwise(0)).alias("n_violations"),
    )


def q_dq_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audit suite over the TPC-H-ish tables: one row per data contract."""
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    lineitem = load_table(spark, sf_dir, "lineitem")
    docs = load_table(spark, sf_dir, "documents")

    # PK uniqueness: count(*) - count(distinct key), computed as one agg
    pk = orders.agg(
        F.lit("orders_pk_unique").alias("check_name"),
        F.count(F.lit(1)).alias("n_checked"),
        (F.count(F.lit(1)) - F.countDistinct("o_orderkey")).alias("n_violations"),
    )
    # FK integrity: orders whose custkey has no parent row
    orphans = (
        orders.join(customer, orders["o_custkey"] == customer["c_custkey"], "left_anti")
        .agg(F.count(F.lit(1)).alias("n_orphans"))
        .select(
            F.lit("orders_custkey_fk").alias("check_name"),
            F.lit(None).cast("long").alias("n_checked"),
            F.col("n_orphans").alias("n_violations"),
        )
    )
    # count the FK base separately (the anti join discards the non-orphans)
    fk_base = orders.agg(F.count(F.lit(1)).alias("n"))
    orphans = orphans.crossJoin(fk_base).select(
        "check_name", F.col("n").alias("n_checked"), "n_violations"
    )
    qty = _check(
        lineitem,
        "lineitem_qty_range",
        (F.col("l_quantity") < QTY_LO) | (F.col("l_quantity") > QTY_HI),
    )
    blank = _check(
        docs,
        "documents_nonblank",
        F.col("text").isNull() | (F.length(F.trim(F.col("text"))) == 0),
    )
    return pk.unionByName(orphans).unionByName(qty).unionByName(blank)


_ORACLE_DQ_AUDIT = f"""
SELECT 'orders_pk_unique' AS check_name,
       COUNT(*) AS n_checked,
       COUNT(*) - COUNT(DISTINCT o_orderkey) AS n_violations
FROM orders
UNION ALL
SELECT 'orders_custkey_fk',
       (SELECT COUNT(*) FROM orders),
       (SELECT COUNT(*) FROM orders o
         WHERE NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey))
UNION ALL
SELECT 'lineitem_qty_range', COUNT(*),
       CAST(SUM(CASE WHEN l_quantity < {QTY_LO} OR l_quantity > {QTY_HI} THEN 1 ELSE 0 END) AS BIGINT)
FROM lineitem
UNION ALL
SELECT 'documents_nonblank', COUNT(*),
       CAST(SUM(CASE WHEN text IS NULL OR length(trim(text)) = 0 THEN 1 ELSE 0 END) AS BIGINT)
FROM documents
"""


# ---------------------------------------------------------------------------
# Snapshot diff (table reconciliation)
# ---------------------------------------------------------------------------

def _snapshots(spark: SparkSession, sf_dir: str) -> tuple[DataFrame, DataFrame]:
    """Two deterministic snapshots of ``orders`` simulating table drift:
    snapshot A lacks keys ≡7 (mod 10) ("inserted since"), snapshot B lacks
    keys ≡3 (mod 10) ("deleted since") and bumps o_totalprice by 1.0 where
    o_orderkey ≡0 (mod 13) ("updated since")."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice", "o_orderdate"
    )
    snap_a = orders.filter(F.col("o_orderkey") % 10 != 7)
    snap_b = orders.filter(F.col("o_orderkey") % 10 != 3).withColumn(
        "o_totalprice",
        F.when(F.col("o_orderkey") % 13 == 0, F.col("o_totalprice") + F.lit(1.0)).otherwise(
            F.col("o_totalprice")
        ),
    )
    return snap_a, snap_b


def q_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot reconciliation: classify every primary key across two table
    snapshots as added / removed / changed / unchanged and count each class
    — the engine-side table-diff a lakehouse needs for CDC validation,
    replication checks, and migration sign-off (the reference trusts MySQL
    to be the single copy; a lakehouse has many).

    Scale shape: one full-outer join on the primary key (sort-merge at
    100 TB; both sides are scans of the same partitioned table so AQE can
    co-locate), then per-class hash-agg to 4 rows. Change detection is
    null-safe column-by-column comparison (``IS DISTINCT FROM``), NOT a
    concat-string hash — float→string formatting differs across engines,
    null-safe equality does not. At 100 TB the same plan runs
    per-partition with the join key pre-bucketed, making the diff
    embarrassingly parallel.
    """
    snap_a, snap_b = _snapshots(spark, sf_dir)
    a = snap_a.alias("a")
    b = snap_b.alias("b")
    joined = a.join(b, F.col("a.o_orderkey") == F.col("b.o_orderkey"), "full_outer")
    changed = (
        ~F.col("a.o_totalprice").eqNullSafe(F.col("b.o_totalprice"))
        | ~F.col("a.o_orderstatus").eqNullSafe(F.col("b.o_orderstatus"))
        | ~F.col("a.o_custkey").eqNullSafe(F.col("b.o_custkey"))
        | ~F.col("a.o_orderdate").eqNullSafe(F.col("b.o_orderdate"))
    )
    cls = (
        F.when(F.col("a.o_orderkey").isNull(), F.lit("added"))
        .when(F.col("b.o_orderkey").isNull(), F.lit("removed"))
        .when(changed, F.lit("changed"))
        .otherwise(F.lit("unchanged"))
    )
    return (
        joined.select(cls.alias("change_type"))
        .groupBy("change_type")
        .agg(F.count(F.lit(1)).alias("n_rows"))
    )


_SQL_SNAPSHOTS = """
snap_a AS (
  SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderdate
  FROM orders WHERE o_orderkey % 10 <> 7
),
snap_b AS (
  SELECT o_orderkey, o_custkey, o_orderstatus,
         CASE WHEN o_orderkey % 13 = 0 THEN o_totalprice + 1.0 ELSE o_totalprice END
           AS o_totalprice,
         o_orderdate
  FROM orders WHERE o_orderkey % 10 <> 3
)
"""

_ORACLE_SNAPSHOT_DIFF = f"""
WITH {_SQL_SNAPSHOTS}
SELECT change_type, COUNT(*) AS n_rows FROM (
  SELECT CASE
           WHEN a.o_orderkey IS NULL THEN 'added'
           WHEN b.o_orderkey IS NULL THEN 'removed'
           WHEN (a.o_totalprice IS DISTINCT FROM b.o_totalprice)
             OR (a.o_orderstatus IS DISTINCT FROM b.o_orderstatus)
             OR (a.o_custkey IS DISTINCT FROM b.o_custkey)
             OR (a.o_orderdate IS DISTINCT FROM b.o_orderdate) THEN 'changed'
           ELSE 'unchanged'
         END AS change_type
  FROM snap_a a FULL OUTER JOIN snap_b b ON a.o_orderkey = b.o_orderkey
)
GROUP BY change_type
"""


# ---------------------------------------------------------------------------
# Table statistics collection (ANALYZE)
# ---------------------------------------------------------------------------

_STATS_COLS = ["o_orderkey", "o_custkey", "o_orderstatus", "o_orderdate"]


def q_table_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANALYZE-style per-column statistics over ``orders`` — row count,
    null count, exact NDV, min/max — the inputs a cost-based optimizer
    (and every lakehouse table format's metadata) needs for join ordering
    and file skipping. The reference gets these implicitly from MySQL's
    ANALYZE TABLE; a lakehouse engine must compute them.

    One scan, one aggregate: all per-column stats are computed in a single
    pass, then pivoted long with ``stack`` (rows = columns) — never one
    scan per column. min/max surface as strings; the stat set sticks to
    int/string/date columns because float→string formatting is
    engine-specific (Java ``1.0E7`` vs C ``10000000.0``) and would break
    the cross-engine gate, while int/date renderings are identical.
    Exact NDV here (the gate needs exactness); at 100 TB the same
    operator takes ``approx_count_distinct`` — the expand-free HLL path
    the ``approx_distinct`` matrix entry validates.
    """
    orders = load_table(spark, sf_dir, "orders")
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c in _STATS_COLS:
        aggs += [
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).alias(f"{c}__nulls"),
            F.countDistinct(c).alias(f"{c}__ndv"),
            F.min(F.col(c).cast("string")).alias(f"{c}__min"),
            F.max(F.col(c).cast("string")).alias(f"{c}__max"),
        ]
    one = orders.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', {c}__nulls, {c}__ndv, {c}__min, {c}__max" for c in _STATS_COLS
    )
    return one.selectExpr(
        "n_rows",
        f"stack({len(_STATS_COLS)}, {stack_args}) AS "
        "(column_name, n_nulls, n_distinct, min_value, max_value)",
    ).select("column_name", "n_rows", "n_nulls", "n_distinct", "min_value", "max_value")


def _sql_table_stats() -> str:
    selects = []
    for c in _STATS_COLS:
        selects.append(f"""
SELECT '{c}' AS column_name, n_rows,
       {c}__nulls AS n_nulls, {c}__ndv AS n_distinct,
       {c}__min AS min_value, {c}__max AS max_value
FROM one""")
    inner = ", ".join(
        f"""CAST(SUM(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS {c}__nulls,
       COUNT(DISTINCT {c}) AS {c}__ndv,
       MIN(CAST({c} AS VARCHAR)) AS {c}__min,
       MAX(CAST({c} AS VARCHAR)) AS {c}__max"""
        for c in _STATS_COLS
    )
    return f"""
WITH one AS (
  SELECT COUNT(*) AS n_rows, {inner}
  FROM orders
)
{" UNION ALL ".join(selects)}
"""


# ---------------------------------------------------------------------------
# Join-size estimation (sampled key-frequency sketch vs exact)
# ---------------------------------------------------------------------------

JSE_MOD = 8  # keep keys with md5(key) % JSE_MOD == 0 → 1/8 key sample


def q_join_size_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-join output-size estimation — the number a cost-based planner
    needs BEFORE running the join: |lineitem ⋈ lineitem on l_partkey| =
    Σ_k c_k². The estimator sums c_k² over a deterministic 1/{JSE_MOD}
    HASH sample of the key domain and scales by {JSE_MOD} (key-hash
    sampling is the correct design: uniform ROW sampling biases c² terms
    quadratically, while taking whole keys preserves each sampled key's
    exact contribution). Emitted next to the exact Σc² ground truth and
    the relative error, so the estimator is *audited*, not trusted.

    One aggregation computes both (the sample term is a CASE inside the
    same pass over the per-key counts); everything is integer-exact
    until the final error ratio. At 100 TB the per-key count table is
    the only shuffle, and the sample-side cost is literally zero extra.
    """
    from us_flight_bigdata_dashboard_spark.operators.dedup import _sql_hex_to_int  # noqa: F401

    li = load_table(spark, sf_dir, "lineitem")
    counts = li.groupBy("l_partkey").agg(F.count(F.lit(1)).alias("c"))
    sampled = (
        F.conv(
            F.substring(F.md5(F.col("l_partkey").cast("string")), 1, 15), 16, 10
        ).cast("bigint")
        % JSE_MOD
        == 0
    )
    agg = counts.agg(
        F.count(F.lit(1)).alias("n_keys"),
        F.sum(F.when(sampled, 1).otherwise(0)).alias("n_sampled_keys"),
        F.sum(F.col("c") * F.col("c")).alias("actual_rows"),
        (F.lit(JSE_MOD) * F.sum(F.when(sampled, F.col("c") * F.col("c")).otherwise(0))).alias(
            "est_rows"
        ),
    )
    return agg.select(
        "n_keys",
        "n_sampled_keys",
        "est_rows",
        "actual_rows",
        (
            F.lit(100.0)
            * (F.col("est_rows") - F.col("actual_rows")).cast("double")
            / F.col("actual_rows").cast("double")
        ).alias("rel_error_pct"),
    )


def _sql_join_size_estimate() -> str:
    from us_flight_bigdata_dashboard_spark.operators.dedup import _sql_hex_to_int

    h = _sql_hex_to_int("md5(CAST(l_partkey AS VARCHAR))", 1, 15)
    return f"""
WITH counts AS (
  SELECT l_partkey, COUNT(*) AS c, ({h} % {JSE_MOD} = 0) AS sampled
  FROM lineitem GROUP BY l_partkey
)
SELECT COUNT(*) AS n_keys,
       CAST(SUM(CASE WHEN sampled THEN 1 ELSE 0 END) AS BIGINT) AS n_sampled_keys,
       CAST({JSE_MOD} * SUM(CASE WHEN sampled THEN c * c ELSE 0 END) AS BIGINT) AS est_rows,
       CAST(SUM(c * c) AS BIGINT) AS actual_rows,
       100.0 * CAST({JSE_MOD} * SUM(CASE WHEN sampled THEN c * c ELSE 0 END)
                    - SUM(c * c) AS DOUBLE)
             / CAST(SUM(c * c) AS DOUBLE) AS rel_error_pct
FROM counts
"""


# ---------------------------------------------------------------------------
# k-anonymity audit (privacy release check over quasi-identifiers)
# ---------------------------------------------------------------------------

KANON_K = 5
KANON_CHAR_BIN = 256


def q_kanon_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity audit of the documents table under the quasi-identifier
    tuple (lang, source, n_chars÷{KANON_CHAR_BIN} size bin): per language,
    how many equivalence classes fall below k={KANON_K} members and how
    many rows sit in them — the rows a privacy-safe release would have to
    suppress or generalize. The standard pre-release check for any
    training-data export that carries user-derived metadata.

    Plan: two chained additive aggregations (QI-class counts, then per-
    language rollup of class stats) — map-side combine on both, no joins,
    no windows; the class-count intermediate is bounded by the QI domain,
    not the row count, so the second agg is near-free at any scale."""
    docs = load_table(spark, sf_dir, "documents")
    classes = docs.groupBy(
        "lang",
        "source",
        F.expr(f"n_chars div {KANON_CHAR_BIN}").alias("size_bin"),
    ).agg(F.count(F.lit(1)).alias("class_size"))
    unsafe = F.col("class_size") < KANON_K
    return (
        classes.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_classes"),
            F.sum(F.when(unsafe, 1).otherwise(0)).alias("n_unsafe_classes"),
            F.sum(F.when(unsafe, F.col("class_size")).otherwise(0)).alias(
                "rows_at_risk"
            ),
            F.sum("class_size").alias("n_rows"),
        )
        .orderBy("lang")
    )


_ORACLE_KANON_AUDIT = f"""
WITH classes AS (
  SELECT lang, source, n_chars // {KANON_CHAR_BIN} AS size_bin,
         COUNT(*) AS class_size
  FROM documents
  GROUP BY 1, 2, 3
)
SELECT lang,
       COUNT(*) AS n_classes,
       CAST(SUM(CASE WHEN class_size < {KANON_K} THEN 1 ELSE 0 END) AS BIGINT) AS n_unsafe_classes,
       CAST(SUM(CASE WHEN class_size < {KANON_K} THEN class_size ELSE 0 END) AS BIGINT) AS rows_at_risk,
       CAST(SUM(class_size) AS BIGINT) AS n_rows
FROM classes
GROUP BY lang
ORDER BY lang
"""


# ---------------------------------------------------------------------------
# l-diversity audit (the rung above k-anonymity)
# ---------------------------------------------------------------------------

LDIV_L = 3          # required distinct sensitive values per QI class
LDIV_BAL_BIN = 1000  # account-balance bin width (the sensitive attribute)


def q_ldiversity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct l-diversity audit of the customer table: k-anonymity
    (``kanon_audit``) only bounds CLASS SIZE — a class of 50 rows that all
    share one account-balance bracket still leaks the sensitive value to
    anyone who can place a customer in the class (the homogeneity attack
    k-anonymity famously misses; Machanavajjhala et al. 2007). Under QI
    (mktsegment, nation) with the sensitive attribute = acctbal÷{bin}
    bracket, report per segment: classes, rows, classes below l={l}
    distinct brackets, rows exposed in them, and the worst (minimum)
    class diversity — the release gate is min_l ≥ {l}.

    Plan: one COUNT DISTINCT agg over QI (hash-partial expandable), one
    segment rollup on the QI-domain-bounded class table — the kanon_audit
    shape with a distinct-count in the middle; no joins, no windows."""
    cust = load_table(spark, sf_dir, "customer")
    classes = cust.groupBy("c_mktsegment", "c_nationkey").agg(
        F.count(F.lit(1)).alias("class_size"),
        F.countDistinct(F.expr(f"CAST(floor(c_acctbal / {LDIV_BAL_BIN}) AS BIGINT)")).alias(
            "l_distinct"
        ),
    )
    low = F.col("l_distinct") < LDIV_L
    return (
        classes.groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_classes"),
            F.sum("class_size").alias("n_rows"),
            F.sum(F.when(low, 1).otherwise(0)).alias("n_low_diversity"),
            F.sum(F.when(low, F.col("class_size")).otherwise(0)).alias("rows_exposed"),
            F.min("l_distinct").alias("min_l"),
        )
        .orderBy("c_mktsegment")
    )


q_ldiversity_audit.__doc__ = q_ldiversity_audit.__doc__ and q_ldiversity_audit.__doc__.format(
    bin=LDIV_BAL_BIN, l=LDIV_L
)

_ORACLE_LDIVERSITY = f"""
WITH classes AS (
  SELECT c_mktsegment, c_nationkey,
         COUNT(*) AS class_size,
         COUNT(DISTINCT CAST(floor(c_acctbal / {LDIV_BAL_BIN}) AS BIGINT)) AS l_distinct
  FROM customer
  GROUP BY 1, 2
)
SELECT c_mktsegment,
       COUNT(*) AS n_classes,
       CAST(SUM(class_size) AS BIGINT) AS n_rows,
       CAST(SUM(CASE WHEN l_distinct < {LDIV_L} THEN 1 ELSE 0 END) AS BIGINT)
         AS n_low_diversity,
       CAST(SUM(CASE WHEN l_distinct < {LDIV_L} THEN class_size ELSE 0 END) AS BIGINT)
         AS rows_exposed,
       CAST(MIN(l_distinct) AS BIGINT) AS min_l
FROM classes
GROUP BY 1
ORDER BY c_mktsegment
"""


# ---------------------------------------------------------------------------
# Benford first-digit audit (fraud/synthetic-data screening)
# ---------------------------------------------------------------------------

# log10(1 + 1/d) folded in Python so BOTH engines receive the identical
# double literal (DuckDB parses bare decimal literals as DECIMAL, not
# DOUBLE — the HLL_SCALE lesson — so the oracle casts the repr explicitly).
_BENFORD_P = {d: __import__("math").log10(1.0 + 1.0 / d) for d in range(1, 10)}


def q_benford_digits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law first-significant-digit audit of order totals — the
    classic screening test for fabricated or synthetically generated
    monetary data (naturally occurring multi-magnitude amounts follow
    P(d) = log10(1+1/d); uniform generators don't, and TPC-H's uniform
    pricing is exactly the kind of synthetic signal the test flags).

    Determinism: digit counts are exact integers; the expected
    probabilities are Python-folded double literals identical in both
    engines; observed share, deviation, and the per-digit chi-square
    contribution are each a short fixed-shape IEEE expression on those
    exact inputs. No engine-ordered float aggregation anywhere (the
    chi-square statistic is left as per-digit contributions rather than
    summed, so no order-dependent float SUM — consumers sum 9 rows).

    Scale shape: ONE map-side-combinable hash agg to ≤9 groups; the
    window total is over 9 rows. Nothing else touches the raw scan.
    """
    orders = load_table(spark, sf_dir, "orders")
    digit = F.substring(
        F.floor(F.col("o_totalprice")).cast("bigint").cast("string"), 1, 1
    ).cast("int")
    per_d = orders.groupBy(digit.alias("digit")).agg(
        F.count(F.lit(1)).cast("long").alias("obs")
    )
    from pyspark.sql import Window as _W

    n = F.sum("obs").over(_W.partitionBy()).cast("long")
    expected = F.lit(None).cast("double")
    # digit → folded literal (CASE over 9 constants keeps codegen trivial)
    expected = F.when(F.col("digit") == 1, F.lit(_BENFORD_P[1]))
    for d in range(2, 10):
        expected = expected.when(F.col("digit") == d, F.lit(_BENFORD_P[d]))
    with_n = per_d.select("digit", "obs", n.alias("n"), expected.alias("expected_p"))
    obs_p = F.col("obs").cast("double") / F.col("n").cast("double")
    exp_cnt = F.col("n").cast("double") * F.col("expected_p")
    dev = obs_p - F.col("expected_p")
    chi = (F.col("obs").cast("double") - exp_cnt) * (
        F.col("obs").cast("double") - exp_cnt
    ) / exp_cnt
    return with_n.select(
        "digit",
        "obs",
        "n",
        "expected_p",
        obs_p.alias("observed_p"),
        dev.alias("deviation"),
        chi.alias("chi2_term"),
    ).orderBy("digit")


def _sql_benford() -> str:
    case = " ".join(
        f"WHEN digit = {d} THEN CAST('{_BENFORD_P[d]!r}' AS DOUBLE)"
        for d in range(1, 10)
    )
    return f"""
WITH per_d AS (
  SELECT CAST(SUBSTRING(CAST(CAST(FLOOR(o_totalprice) AS BIGINT) AS VARCHAR), 1, 1) AS INTEGER) AS digit,
         CAST(COUNT(*) AS BIGINT) AS obs
  FROM orders GROUP BY 1
), with_n AS (
  SELECT digit, obs,
         CAST(SUM(obs) OVER () AS BIGINT) AS n,
         CASE {case} END AS expected_p
  FROM per_d
)
SELECT digit, obs, n, expected_p,
       CAST(obs AS DOUBLE) / CAST(n AS DOUBLE) AS observed_p,
       CAST(obs AS DOUBLE) / CAST(n AS DOUBLE) - expected_p AS deviation,
       (CAST(obs AS DOUBLE) - CAST(n AS DOUBLE) * expected_p)
         * (CAST(obs AS DOUBLE) - CAST(n AS DOUBLE) * expected_p)
         / (CAST(n AS DOUBLE) * expected_p) AS chi2_term
FROM with_n
ORDER BY digit
"""


# ---------------------------------------------------------------------------
# k-anonymity generalization ladder (audit → enforce)
# ---------------------------------------------------------------------------

# quasi-identifier generalization levels, coarsest last
KANON_LADDER = [
    ("L0_full", "lang, source, size_bin_fine"),
    ("L1_coarse_size", "lang, source, size_bin_coarse"),
    ("L2_drop_source", "lang, size_bin_coarse"),
    ("L3_lang_only", "lang"),
]
KANON_COARSE_BIN = 500


def q_kanon_generalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ENFORCEMENT step k-anonymity audits point at: walk a fixed
    generalization ladder over the quasi-identifier tuple — full QIs →
    coarser size bins → drop source → language only — and report, per
    level, how much of the release still violates k={k} (classes below
    k, rows at risk, the minimum class size). The release policy is then
    a read-off: publish at the first level whose rows_at_risk hits an
    acceptable floor, suppressing the remainder (generalization trades
    utility for safety monotonically; the ladder makes the trade
    EXPLICIT instead of a blanket suppress — Samarati's original
    full-domain generalization, unrolled).

    Exactness: every statistic is an integer count over integer-binned
    QIs. Scale shape: one hash agg per level over progressively coarser
    keys (all map-side combinable, each bounded by its QI domain), union
    of 4 level summaries.
    """
    docs = load_table(spark, sf_dir, "documents").select(
        "lang",
        "source",
        F.expr(f"n_chars div {KANON_CHAR_BIN}").alias("size_bin_fine"),
        F.expr(f"n_chars div {KANON_COARSE_BIN}").alias("size_bin_coarse"),
    )
    level_keys = [
        ("L0_full", ["lang", "source", "size_bin_fine"]),
        ("L1_coarse_size", ["lang", "source", "size_bin_coarse"]),
        ("L2_drop_source", ["lang", "size_bin_coarse"]),
        ("L3_lang_only", ["lang"]),
    ]
    outs = []
    for name, keys in level_keys:
        classes = docs.groupBy(*keys).agg(F.count(F.lit(1)).alias("class_size"))
        unsafe = F.col("class_size") < KANON_K
        outs.append(
            classes.agg(
                F.lit(name).alias("level"),
                F.count(F.lit(1)).cast("long").alias("n_classes"),
                F.sum(F.when(unsafe, 1).otherwise(0))
                .cast("long")
                .alias("n_unsafe_classes"),
                F.sum(F.when(unsafe, F.col("class_size")).otherwise(0))
                .cast("long")
                .alias("rows_at_risk"),
                F.min("class_size").cast("long").alias("min_class_size"),
            )
        )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out.orderBy("level")
q_kanon_generalize.__doc__ = q_kanon_generalize.__doc__ and q_kanon_generalize.__doc__.format(k=KANON_K)


def _sql_kanon_generalize() -> str:
    levels = [
        ("L0_full", f"lang, source, n_chars // {KANON_CHAR_BIN}"),
        ("L1_coarse_size", f"lang, source, n_chars // {KANON_COARSE_BIN}"),
        ("L2_drop_source", f"lang, n_chars // {KANON_COARSE_BIN}"),
        ("L3_lang_only", "lang"),
    ]
    parts = []
    for name, keys in levels:
        parts.append(f"""
SELECT '{name}' AS level,
       CAST(COUNT(*) AS BIGINT) AS n_classes,
       CAST(SUM(CASE WHEN class_size < {KANON_K} THEN 1 ELSE 0 END) AS BIGINT)
         AS n_unsafe_classes,
       CAST(SUM(CASE WHEN class_size < {KANON_K} THEN class_size ELSE 0 END)
            AS BIGINT) AS rows_at_risk,
       CAST(MIN(class_size) AS BIGINT) AS min_class_size
FROM (SELECT COUNT(*) AS class_size FROM documents GROUP BY {keys})""")
    return " UNION ALL ".join(parts) + " ORDER BY level"


# ---------------------------------------------------------------------------
# t-closeness audit (the third rung of the k/l/t release-privacy ladder)
# ---------------------------------------------------------------------------

TCLOSE_BAL_BIN = 2000  # ordered sensitive-attribute bracket width
TCLOSE_T = 0.15        # release gate: class EMD to the global distribution
# floor(acctbal / 2000) over the generator's [-999.99, 9999.99] range —
# a LITERAL ordered domain, so per-class bracket counts are fixed columns
# and the EMD is one fixed-order expression (no spine join, no float agg).
_TC_BRACKETS = [-1, 0, 1, 2, 3, 4]


def q_tcloseness_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """t-closeness audit (Li, Li & Venkatasubramanian 2007) of the
    customer table under QI (mktsegment, nation): l-diversity counts
    DISTINCT sensitive values but a class can be "diverse" yet still
    skewed — e.g. 90% of its balances in the top bracket when the
    population holds 20% — and the skew itself leaks. t-closeness bounds
    the EARTH MOVER'S DISTANCE between each class's sensitive-attribute
    distribution and the GLOBAL one; for an ordered domain of m brackets
    EMD = Σ_{{j<m}} |P̂_j − Q̂_j| / (m−1) over cumulative shares. Reports
    per segment: classes, rows, classes/rows beyond t={TCLOSE_T}, and the
    worst class EMD — the release gate is max_t ≤ t.

    Exactness: per-class and global bracket counts are integers from ONE
    hash agg over the LITERAL 6-bracket domain (fixed columns — zero
    cells are real zeros with no spine join); each EMD is a fixed
    left-to-right IEEE expression over 5 cumulative-share terms; the
    global row is a broadcast scalar attach. Scale: one QI-domain-bounded
    agg, then arithmetic — the kanon_audit shape."""
    cust = load_table(spark, sf_dir, "customer")
    br = F.expr(f"CAST(floor(c_acctbal / {TCLOSE_BAL_BIN}) AS BIGINT)")
    conds = [
        F.sum(F.when(br == b, 1).otherwise(0)).cast("long").alias(f"b{i}")
        for i, b in enumerate(_TC_BRACKETS)
    ]
    classes = cust.groupBy("c_mktsegment", "c_nationkey").agg(*conds)
    m = len(_TC_BRACKETS)
    tot = sum((F.col(f"b{i}") for i in range(1, m)), F.col("b0"))
    classes = classes.withColumn("class_size", tot)
    glob = classes.agg(
        F.sum("class_size").cast("long").alias("g_n"),
        *[F.sum(f"b{i}").cast("long").alias(f"g{i}") for i in range(m)],
    )
    j = classes.crossJoin(F.broadcast(glob))
    nd = F.col("class_size").cast("double")
    gnd = F.col("g_n").cast("double")

    def cum(prefix: str, upto: int):
        return sum(
            (F.col(f"{prefix}{i}") for i in range(1, upto + 1)),
            F.col(f"{prefix}0"),
        )

    terms = [
        F.abs(cum("b", k).cast("double") / nd - cum("g", k).cast("double") / gnd)
        for k in range(m - 1)
    ]
    emd = sum(terms[1:], terms[0]) / F.lit(float(m - 1))
    scored = j.select("c_mktsegment", "class_size", emd.alias("t_emd"))
    above = F.col("t_emd") > F.lit(TCLOSE_T)
    return (
        scored.groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_classes"),
            F.sum("class_size").cast("long").alias("n_rows"),
            F.sum(F.when(above, 1).otherwise(0)).cast("long").alias("n_above_t"),
            F.sum(F.when(above, F.col("class_size")).otherwise(0))
            .cast("long")
            .alias("rows_above_t"),
            F.max("t_emd").alias("max_t"),
        )
        .orderBy("c_mktsegment")
    )


q_tcloseness_audit.__doc__ = q_tcloseness_audit.__doc__ and q_tcloseness_audit.__doc__.format(TCLOSE_T=TCLOSE_T)


def _sql_tcloseness() -> str:
    m = len(_TC_BRACKETS)
    conds = ",\n         ".join(
        f"CAST(SUM(CASE WHEN CAST(floor(c_acctbal / {TCLOSE_BAL_BIN}) AS BIGINT) = {b}"
        f" THEN 1 ELSE 0 END) AS BIGINT) AS b{i}"
        for i, b in enumerate(_TC_BRACKETS)
    )
    tot = " + ".join(f"b{i}" for i in range(m))
    gsel = ", ".join(f"CAST(SUM(b{i}) AS BIGINT) AS g{i}" for i in range(m))

    def cum(prefix, upto):
        return " + ".join(f"{prefix}{i}" for i in range(upto + 1))

    terms = " + ".join(
        f"ABS(CAST({cum('b', k)} AS DOUBLE) / CAST(class_size AS DOUBLE)"
        f" - CAST({cum('g', k)} AS DOUBLE) / CAST(g_n AS DOUBLE))"
        for k in range(m - 1)
    )
    return f"""
WITH classes AS (
  SELECT c_mktsegment, c_nationkey,
         {conds}
  FROM customer GROUP BY 1, 2
), sized AS (
  SELECT *, {tot} AS class_size FROM classes
), gall AS (
  SELECT CAST(SUM(class_size) AS BIGINT) AS g_n, {gsel} FROM sized
), scored AS (
  SELECT c_mktsegment, class_size,
         ({terms}) / {float(m - 1)!r} AS t_emd
  FROM sized CROSS JOIN gall
)
SELECT c_mktsegment,
       COUNT(*) AS n_classes,
       CAST(SUM(class_size) AS BIGINT) AS n_rows,
       CAST(SUM(CASE WHEN t_emd > {TCLOSE_T!r} THEN 1 ELSE 0 END) AS BIGINT) AS n_above_t,
       CAST(SUM(CASE WHEN t_emd > {TCLOSE_T!r} THEN class_size ELSE 0 END) AS BIGINT) AS rows_above_t,
       MAX(t_emd) AS max_t
FROM scored
GROUP BY 1
ORDER BY c_mktsegment
"""


# ---------------------------------------------------------------------------
# Randomized response (round 10): local differential privacy, rationally
# ---------------------------------------------------------------------------

RR_Q_DEN = 4  # flip with probability q = 1/RR_Q_DEN
# epsilon = ln((1-q)/q) = ln 3, Python-precomputed (the LUT escape from the
# no-transcendentals policy — a single literal both engines carry verbatim)
RR_EPSILON = 1.0986122886681098


def q_dp_randomized_response(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Randomized-response count of urgent orders under LOCAL differential
    privacy: each row reports its sensitive bit (priority = 1-URGENT)
    FLIPPED with probability q = 1/{d} — the Warner (1965) mechanism that
    is ε-LDP at ε = ln((1−q)/q) — and the analyst debiases the noisy
    count: n̂ = (reported − q·n)/(1−2q). The privacy ladder's mechanism
    entry beside the ``kanon``/``ldiversity``/``tcloseness`` audits
    (those measure re-identification risk; this one actually pays
    privacy for utility and shows the exchange rate in the gate-checked
    error column). The flip coin is a SEEDED md5 hash of the order key
    (mod {d} == 0) — deterministic, so both engines flip the identical
    rows and the whole mechanism is rational: counts are exact integers,
    the debias is one IEEE expression, ε is a Python-precomputed
    literal.

    Scale shape: one map-side-combinable 3-sum aggregate over the scan —
    the true count rides along only as the verification baseline (a real
    deployment never sees it)."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority"
    )
    b = (F.col("o_orderpriority") == "1-URGENT").cast("int")
    coin = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.col("o_orderkey").cast("string"), F.lit(":rr"))),
                1,
                12,
            ),
            16,
            10,
        ).cast("bigint")
        % F.lit(RR_Q_DEN)
        == 0
    ).cast("int")
    reported = (b + coin) % F.lit(2)  # XOR: flip when coin = 1
    agg = orders.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(b).cast("long").alias("true_count"),
        F.sum(reported).cast("long").alias("reported_count"),
    )
    q = 1.0 / RR_Q_DEN
    est = (
        F.col("reported_count").cast("double") - F.lit(q) * F.col("n").cast("double")
    ) / F.lit(1.0 - 2.0 * q)
    true_d = F.col("true_count").cast("double")
    return agg.select(
        "n",
        "true_count",
        "reported_count",
        est.alias("estimated_count"),
        F.lit(RR_EPSILON).alias("epsilon"),
        ((est - true_d) / true_d * F.lit(100.0)).alias("rel_err_pct"),
    )
q_dp_randomized_response.__doc__ = q_dp_randomized_response.__doc__ and q_dp_randomized_response.__doc__.format(d=RR_Q_DEN)


def _sql_rr() -> str:
    from us_flight_bigdata_dashboard_spark.operators.dedup import _sql_hex_to_int

    hx = _sql_hex_to_int("md5(CAST(o_orderkey AS VARCHAR) || ':rr')", 1, 12)
    q = 1.0 / RR_Q_DEN
    return f"""
WITH bits AS (
  SELECT CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END AS b,
         CASE WHEN {hx} % {RR_Q_DEN} = 0 THEN 1 ELSE 0 END AS coin
  FROM orders
), agg AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(b) AS BIGINT) AS true_count,
         CAST(SUM((b + coin) % 2) AS BIGINT) AS reported_count
  FROM bits
)
SELECT n, true_count, reported_count,
       (CAST(reported_count AS DOUBLE) - {q!r} * CAST(n AS DOUBLE))
         / {1.0 - 2.0 * q!r} AS estimated_count,
       CAST({RR_EPSILON!r} AS DOUBLE) AS epsilon,
       ((CAST(reported_count AS DOUBLE) - {q!r} * CAST(n AS DOUBLE))
          / {1.0 - 2.0 * q!r} - CAST(true_count AS DOUBLE))
         / CAST(true_count AS DOUBLE) * 100.0 AS rel_err_pct
FROM agg
"""


# ---------------------------------------------------------------------------
# Key-sequence gap audit (round 10 wave 17)
# ---------------------------------------------------------------------------


def q_sequence_gap_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Surrogate-key SEQUENCE continuity audit on o_orderkey: how much of
    the key range is missing, how many gaps, and where the largest one
    starts — the data-quality check that catches silent partition loss
    and botched backfills (a CDC pipeline that dropped a file leaves a
    contiguous hole; uniform sparseness is benign by-design skipping,
    exactly what TPC-H keys exhibit). ``dq_audit`` checks uniqueness
    and FK orphans; THIS is the continuity axis neither covers.

    Exactness: total_missing = (max − min + 1) − n is CLOSED FORM (no
    window); the gap profile (count of gaps > 1, the largest gap and
    its start) uses one lag over the sorted distinct keys — integer
    arithmetic end-to-end, deterministic argmax by (gap desc, key asc).
    Scale shape: one agg for the closed form + the bucketed lag over
    DISTINCT keys (r14 optimization — the ``global_rank_bucketed``
    decomposition, no single-task window) + a max_by argmax."""
    orders = load_table(spark, sf_dir, "orders")
    keys = (
        orders.select(F.col("o_orderkey").alias("k"))
        .distinct()
        .localCheckpoint(eager=False)
    )
    summary = keys.agg(
        F.count(F.lit(1)).cast("long").alias("n_keys"),
        F.min("k").cast("long").alias("key_min"),
        F.max("k").cast("long").alias("key_max"),
    )
    # bucketed LAG over the distinct-key order (r14 optimization — no
    # single-task window): within-bucket lag; each bucket's first row
    # takes the PREVIOUS non-empty bucket's max key via a ≤1024-row
    # broadcast; the first global row keeps a NULL gap like the plain LAG.
    st = keys.agg(F.min("k").alias("_mn"), F.max("k").alias("_mx"))
    kb = F.coalesce(
        F.least(
            F.lit(_CUM_BUCKETS - 1),
            F.floor(
                (F.col("k") - F.col("_mn"))
                * _CUM_BUCKETS
                / F.nullif(
                    (F.col("_mx") - F.col("_mn")).cast("double"), F.lit(0.0)
                )
            ),
        ).cast("int"),
        F.lit(0),
    )
    bk = keys.crossJoin(F.broadcast(st)).withColumn("_b", kb).drop("_mn", "_mx")
    prevs = (
        bk.groupBy("_b")
        .agg(F.max("k").alias("_blast"))
        .select(
            "_b", F.lag("_blast").over(Window.orderBy("_b")).alias("_prev_last")
        )
    )
    gaps = (
        bk.join(F.broadcast(prevs), "_b")
        .select(
            "k",
            (
                F.col("k")
                - F.coalesce(
                    F.lag("k", 1).over(Window.partitionBy("_b").orderBy("k")),
                    F.col("_prev_last"),
                )
            )
            .cast("long")
            .alias("gap"),
        )
        .filter(F.col("gap") > 1)
    )
    gap_stats = gaps.agg(
        F.count(F.lit(1)).cast("long").alias("n_gaps"),
        F.max("gap").cast("long").alias("largest_gap"),
    )
    # aggregate (not filter) so a DENSE key space still yields ONE row
    # with NULLs — a healthy sequence is a result, not an empty frame.
    # argmax by (gap desc, k asc) via max_by on (gap, -k) — no global
    # rank window (r14 optimization; (gap, k) pairs are unique).
    biggest = gaps.agg(
        F.max_by(
            F.col("k") - F.col("gap") + 1,
            F.struct(F.col("gap").alias("g"), (-F.col("k")).alias("nk")),
        )
        .cast("long")
        .alias("largest_gap_start")
    )
    out = summary.crossJoin(F.broadcast(gap_stats)).crossJoin(F.broadcast(biggest))
    span = (F.col("key_max") - F.col("key_min") + 1).cast("double")
    return out.select(
        "n_keys",
        "key_min",
        "key_max",
        ((F.col("key_max") - F.col("key_min") + 1) - F.col("n_keys"))
        .cast("long")
        .alias("total_missing"),
        "n_gaps",
        "largest_gap",
        "largest_gap_start",
        (F.col("n_keys").cast("double") / span).alias("density"),
    )


_ORACLE_SEQUENCE_GAP = """
WITH keys AS (
  SELECT DISTINCT o_orderkey AS k FROM orders
), summary AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_keys,
         CAST(MIN(k) AS BIGINT) AS key_min,
         CAST(MAX(k) AS BIGINT) AS key_max
  FROM keys
), gaps AS (
  SELECT k, CAST(k - LAG(k, 1) OVER (ORDER BY k) AS BIGINT) AS gap
  FROM keys
  QUALIFY gap > 1
), gap_stats AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_gaps,
         CAST(MAX(gap) AS BIGINT) AS largest_gap
  FROM gaps
), biggest AS (
  SELECT CAST(MAX(CASE WHEN rn = 1 THEN k - gap + 1 END) AS BIGINT) AS largest_gap_start
  FROM (SELECT k, gap, ROW_NUMBER() OVER (ORDER BY gap DESC, k ASC) AS rn FROM gaps)
)
SELECT n_keys, key_min, key_max,
       CAST((key_max - key_min + 1) - n_keys AS BIGINT) AS total_missing,
       n_gaps, largest_gap, largest_gap_start,
       CAST(n_keys AS DOUBLE) / CAST(key_max - key_min + 1 AS DOUBLE) AS density
FROM summary CROSS JOIN gap_stats CROSS JOIN biggest
"""


# ---------------------------------------------------------------------------
# Benford MAD conformity verdict (round 13)
# ---------------------------------------------------------------------------

# Nigrini's first-digit MAD conformity bands (Nigrini 2012, Table 7.1),
# literal cutoffs
_MAD_CLOSE, _MAD_ACCEPTABLE, _MAD_MARGINAL = 0.006, 0.012, 0.015


def _benford_mad_tree() -> dict[str, str]:
    """MAD + worst-digit + verdict as ONE shared expression text over
    exact integer columns n, o1..o9 — fixed left-to-right 9-term
    reduction over the LITERAL digit domain (zero-count digits
    contribute their full expected share), no engine-ordered float SUM
    anywhere."""
    devs = {
        d: f"abs(CAST(o{d} AS DOUBLE) / CAST(n AS DOUBLE) - {_BENFORD_P[d]!r})"
        for d in range(1, 10)
    }
    mad = "((" + " + ".join(devs[d] for d in range(1, 10)) + ") / 9.0)"
    gmax = "GREATEST(" + ", ".join(devs[d] for d in range(1, 10)) + ")"
    worst = "CASE " + " ".join(
        f"WHEN {devs[d]} = {gmax} THEN {d}" for d in range(1, 10)
    ) + " END"
    verdict = (
        f"CASE WHEN {mad} <= {_MAD_CLOSE!r} THEN 'close'"
        f" WHEN {mad} <= {_MAD_ACCEPTABLE!r} THEN 'acceptable'"
        f" WHEN {mad} <= {_MAD_MARGINAL!r} THEN 'marginal'"
        f" ELSE 'nonconformity' END"
    )
    return {"mad": mad, "worst": worst, "verdict": verdict}


def q_benford_mad_conformity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford MAD conformity VERDICT on order totals: mean absolute
    deviation of the nine observed first-digit shares from Benford's
    P(d) = log10(1+1/d), classified against Nigrini's published
    conformity bands (≤0.006 close / ≤0.012 acceptable / ≤0.015
    marginal / else nonconformity — the forensic-accounting standard
    that, unlike ``benford_digits``'s per-digit χ² contributions, gives
    the ONE actionable row an audit pipeline gates on; MAD is the
    Nigrini-recommended scale-free statistic precisely because χ²
    rejects everything at large n).

    Exactness: the nine digit counts are ONE conditional hash agg onto
    the LITERAL digit domain (zero-count digits contribute their full
    expected share — a per-observed-digit frame would silently drop
    them); expected shares are Python-folded double literals; MAD, the
    worst digit (first-match tie-break over the fixed digit order) and
    the verdict are a SINGLE shared expression text evaluated by
    F.expr and the oracle — identical text, identical IEEE tree, and
    the 9-term reduction is a fixed left-to-right chain, not an
    engine-ordered SUM. Degenerate contract: n = 0 → all NULL (guard).

    Scale shape: ONE map-side-combinable hash agg to a 1-row frame;
    literal-domain arithmetic after.

    Reference analog: none (engine addition, SURVEY.md §2.7)."""
    orders = load_table(spark, sf_dir, "orders")
    digit = F.substring(
        F.floor(F.col("o_totalprice")).cast("bigint").cast("string"), 1, 1
    ).cast("int")
    aggs = [F.count(F.lit(1)).cast("long").alias("n")]
    for d in range(1, 10):
        aggs.append(
            F.sum((digit == d).cast("long")).cast("long").alias(f"o{d}")
        )
    red = orders.agg(*aggs)
    t = _benford_mad_tree()
    ok = F.col("n") > 0
    return red.select(
        "n",
        F.when(ok, F.expr(t["mad"])).alias("mad"),
        F.when(ok, F.expr(t["worst"])).cast("int").alias("worst_digit"),
        F.when(ok, F.expr(t["verdict"])).alias("conformity"),
    )


def _sql_benford_mad() -> str:
    t = _benford_mad_tree()
    o_cols = ",\n         ".join(
        f"CAST(SUM(CASE WHEN CAST(substring(CAST(CAST(FLOOR(o_totalprice) AS BIGINT) AS VARCHAR), 1, 1) AS INT) = {d} THEN 1 ELSE 0 END) AS BIGINT) AS o{d}"
        for d in range(1, 10)
    )
    return f"""
WITH red AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         {o_cols}
  FROM orders
)
SELECT n,
       CASE WHEN n > 0 THEN {t['mad']} END AS mad,
       CASE WHEN n > 0 THEN CAST({t['worst']} AS INT) END AS worst_digit,
       CASE WHEN n > 0 THEN {t['verdict']} END AS conformity
FROM red
"""


QUERIES = {
    "benford_mad_conformity": q_benford_mad_conformity,
    "sequence_gap_audit": q_sequence_gap_audit,
    "tcloseness_audit": q_tcloseness_audit,
    "ldiversity_audit": q_ldiversity_audit,
    "dq_audit": q_dq_audit,
    "snapshot_diff": q_snapshot_diff,
    "table_stats": q_table_stats,
    "kanon_audit": q_kanon_audit,
    "join_size_estimate": q_join_size_estimate,
    "benford_digits": q_benford_digits,
    "kanon_generalize": q_kanon_generalize,
    "dp_randomized_response": q_dp_randomized_response,
}

ORACLE = {
    "benford_mad_conformity": _sql_benford_mad(),
    "sequence_gap_audit": _ORACLE_SEQUENCE_GAP,
    "dp_randomized_response": _sql_rr(),
    "ldiversity_audit": _ORACLE_LDIVERSITY,
    "dq_audit": _ORACLE_DQ_AUDIT,
    "snapshot_diff": _ORACLE_SNAPSHOT_DIFF,
    "table_stats": _sql_table_stats(),
    "kanon_audit": _ORACLE_KANON_AUDIT,
    "join_size_estimate": _sql_join_size_estimate(),
    "benford_digits": _sql_benford(),
    "kanon_generalize": _sql_kanon_generalize(),
    "tcloseness_audit": _sql_tcloseness(),
}
