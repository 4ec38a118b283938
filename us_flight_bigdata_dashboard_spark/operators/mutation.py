"""Upsert / MERGE-style mutation semantics expressed relationally.

The reference mutates its MySQL tables with INSERT ... ON DUPLICATE KEY-style
refresh cycles (drop + reload, `src/import_to_mysql.py`); a lakehouse engine
expresses the same intent as MERGE INTO. Spark core has no table-format MERGE
(that lives in Delta/Iceberg), but the *semantics* are a full outer join on
the merge key with per-branch resolution — WHEN MATCHED THEN UPDATE, WHEN NOT
MATCHED THEN INSERT, else keep. That relational form is what the table
formats themselves execute under the hood (minus file-level pruning), so it
is the right Spark-first rendering.

Scale shape: one shuffle join on the merge key (sort-merge at 100 TB; AQE
broadcasts automatically when the change batch is small), then a narrow
per-row CASE resolution — no window, no collect, no iteration. Table formats
add copy-on-write file pruning on top; the dataframe-level semantics here are
what the correctness gate can check cross-engine.

The change batch is derived deterministically from ``orders`` itself (no RNG,
no wall clock — the gate hash-compares against DuckDB): keys ≡0 (mod 7)
become updates (price bump), keys ≡0 (mod 13) become inserts under a shifted
key range that cannot collide with existing keys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from us_flight_bigdata_dashboard_spark.sources.catalog import load_table

INSERT_KEY_OFFSET = 100_000_000
PRICE_BUMP = 100.0


def _change_batch(orders: DataFrame) -> DataFrame:
    """Deterministic MERGE source: updates for keys ≡0 (mod 7), inserts
    (shifted keys) for keys ≡0 (mod 13)."""
    updates = orders.filter(F.col("o_orderkey") % 7 == 0).select(
        F.col("o_orderkey").alias("m_orderkey"),
        F.col("o_custkey").alias("m_custkey"),
        (F.col("o_totalprice") + F.lit(PRICE_BUMP)).alias("m_totalprice"),
        F.lit("U").alias("m_orderstatus"),
    )
    inserts = orders.filter(F.col("o_orderkey") % 13 == 0).select(
        (F.col("o_orderkey") + F.lit(INSERT_KEY_OFFSET)).alias("m_orderkey"),
        F.col("o_custkey").alias("m_custkey"),
        F.col("o_totalprice").alias("m_totalprice"),
        F.lit("N").alias("m_orderstatus"),
    )
    return updates.unionByName(inserts)


def q_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE INTO orders USING batch ON key — WHEN MATCHED UPDATE, WHEN NOT
    MATCHED INSERT — rendered as a full outer join + CASE resolution, with
    an ``action`` audit column (update/insert/keep) so the gate verifies
    every branch took the intended path."""
    orders = load_table(spark, sf_dir, "orders")
    batch = _change_batch(orders)
    joined = orders.join(
        batch, orders["o_orderkey"] == batch["m_orderkey"], "full_outer"
    )
    matched = orders["o_orderkey"].isNotNull() & batch["m_orderkey"].isNotNull()
    insert_only = orders["o_orderkey"].isNull()
    return joined.select(
        F.coalesce(orders["o_orderkey"], batch["m_orderkey"]).alias("o_orderkey"),
        F.coalesce(orders["o_custkey"], batch["m_custkey"]).alias("o_custkey"),
        F.when(matched | insert_only, batch["m_totalprice"])
        .otherwise(orders["o_totalprice"])
        .alias("o_totalprice"),
        F.when(matched | insert_only, batch["m_orderstatus"])
        .otherwise(orders["o_orderstatus"])
        .alias("o_orderstatus"),
        F.when(matched, F.lit("update"))
        .when(insert_only, F.lit("insert"))
        .otherwise(F.lit("keep"))
        .alias("action"),
    )


_ORACLE_MERGE_UPSERT = f"""
WITH batch AS (
  SELECT o_orderkey AS m_orderkey, o_custkey AS m_custkey,
         o_totalprice + {PRICE_BUMP} AS m_totalprice, 'U' AS m_orderstatus
  FROM orders WHERE o_orderkey % 7 = 0
  UNION ALL
  SELECT o_orderkey + {INSERT_KEY_OFFSET}, o_custkey, o_totalprice, 'N'
  FROM orders WHERE o_orderkey % 13 = 0
)
SELECT COALESCE(o.o_orderkey, b.m_orderkey) AS o_orderkey,
       COALESCE(o.o_custkey, b.m_custkey) AS o_custkey,
       CASE WHEN b.m_orderkey IS NOT NULL THEN b.m_totalprice
            ELSE o.o_totalprice END AS o_totalprice,
       CASE WHEN b.m_orderkey IS NOT NULL THEN b.m_orderstatus
            ELSE o.o_orderstatus END AS o_orderstatus,
       CASE WHEN o.o_orderkey IS NOT NULL AND b.m_orderkey IS NOT NULL THEN 'update'
            WHEN o.o_orderkey IS NULL THEN 'insert'
            ELSE 'keep' END AS action
FROM orders o FULL OUTER JOIN batch b ON o.o_orderkey = b.m_orderkey
"""


MV_SPLIT_DATE = "1996-01-01"


def q_mv_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental materialized-view maintenance: the nightly-refresh
    pattern where an aggregate MV is updated by merging the *delta
    partition's* partial aggregate into the stored partials, instead of
    recomputing over the full history.

    Expressed with additive partials (COUNT, decimal SUM — the mergeable
    state; AVG is derived at read time, never stored): MV(base) ⊎
    MV(delta) over a date split of ``orders``. At 100 TB the base side is
    the *stored* dimension-sized MV — only the delta scans — so refresh
    cost is O(delta), not O(history).

    The correctness claim IS the oracle: the merged incremental view must
    equal the direct GROUP BY over the full table, bit-for-bit (decimal
    partials are associative, so base/delta merge order cannot change the
    result)."""
    orders = load_table(spark, sf_dir, "orders")
    split = F.col("o_orderdate") < F.lit(MV_SPLIT_DATE).cast("timestamp")

    def partials(df: DataFrame) -> DataFrame:
        return df.groupBy("o_orderpriority").agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(28,4)")).alias("_sum_dec"),
        )

    base = partials(orders.filter(split))
    delta = partials(orders.filter(~split))
    return (
        base.unionByName(delta)
        .groupBy("o_orderpriority")
        .agg(
            F.sum("n_orders").alias("n_orders"),
            F.sum("_sum_dec").alias("_merged"),
        )
        .select(
            "o_orderpriority",
            "n_orders",
            F.col("_merged").cast("double").alias("sum_price"),
            (F.col("_merged").cast("double") / F.col("n_orders")).alias("avg_price"),
        )
    )


_ORACLE_MV_INCREMENTAL = """
SELECT o_orderpriority,
       COUNT(*) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(28,4))) AS DOUBLE) AS sum_price,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(28,4))) AS DOUBLE) / COUNT(*) AS avg_price
FROM orders
GROUP BY 1
"""


def q_scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-changing-dimension Type 2: versioned rows with
    ``valid_from`` / ``valid_to`` / ``is_current``, built from a change
    log with one keyed window (``lead(valid_from)`` closes each version
    when the next one opens — the standard lakehouse SCD2 build).

    The change log is derived deterministically from ``orders``: every
    order contributes its original version; keys ≡0 (mod 7) gain a second
    version 30 days later with a bumped price. At 100 TB the shape is one
    shuffle on the business key (window), nothing else — no join, no
    iteration; appending a new day of changes only re-windows keys present
    in the delta when the history table is partitioned by key range."""
    orders = load_table(spark, sf_dir, "orders")
    v1 = orders.select(
        "o_orderkey",
        F.col("o_totalprice").alias("price"),
        F.col("o_orderdate").alias("valid_from"),
    )
    v2 = orders.filter(F.col("o_orderkey") % 7 == 0).select(
        "o_orderkey",
        (F.col("o_totalprice") + F.lit(PRICE_BUMP)).alias("price"),
        (F.col("o_orderdate") + F.expr("interval 30 days")).alias("valid_from"),
    )
    from pyspark.sql import Window

    w = Window.partitionBy("o_orderkey").orderBy(F.col("valid_from").asc())
    return (
        v1.unionByName(v2)
        .withColumn("valid_to", F.lead("valid_from").over(w))
        .withColumn("version", F.row_number().over(w))
        .withColumn("is_current", F.col("valid_to").isNull().cast("int"))
    )


_ORACLE_SCD2_HISTORY = f"""
WITH changes AS (
  SELECT o_orderkey, o_totalprice AS price, o_orderdate AS valid_from FROM orders
  UNION ALL
  SELECT o_orderkey, o_totalprice + {PRICE_BUMP}, o_orderdate + INTERVAL 30 DAY
  FROM orders WHERE o_orderkey % 7 = 0
)
SELECT o_orderkey, price, valid_from,
       LEAD(valid_from) OVER w AS valid_to,
       ROW_NUMBER() OVER w AS version,
       CAST(LEAD(valid_from) OVER w IS NULL AS INTEGER) AS is_current
FROM changes
WINDOW w AS (PARTITION BY o_orderkey ORDER BY valid_from ASC)
"""


def q_cdc_latest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC log compaction: collapse a change stream to the latest record
    per key (the read-side of every CDC-ingested table; log-structured
    formats run exactly this before serving).

    The change log is the SCD2 change derivation (every order + a later
    re-priced version for keys ≡0 mod 7); compaction is one keyed window
    ordered by (valid_from DESC, price DESC — a total order so ties can't
    flip across engines) keeping row 1. One shuffle on the key; at 100 TB
    this is the standard compaction shape, and partitioning the log by
    key range makes the window partition-local."""
    orders = load_table(spark, sf_dir, "orders")
    v1 = orders.select(
        "o_orderkey",
        F.col("o_totalprice").alias("price"),
        F.col("o_orderdate").alias("valid_from"),
    )
    v2 = orders.filter(F.col("o_orderkey") % 7 == 0).select(
        "o_orderkey",
        (F.col("o_totalprice") + F.lit(PRICE_BUMP)).alias("price"),
        (F.col("o_orderdate") + F.expr("interval 30 days")).alias("valid_from"),
    )
    from pyspark.sql import Window

    w = Window.partitionBy("o_orderkey").orderBy(
        F.col("valid_from").desc(), F.col("price").desc()
    )
    return (
        v1.unionByName(v2)
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("o_orderkey", "price", F.col("valid_from").alias("effective_from"))
    )


_ORACLE_CDC_LATEST = f"""
WITH changes AS (
  SELECT o_orderkey, o_totalprice AS price, o_orderdate AS valid_from FROM orders
  UNION ALL
  SELECT o_orderkey, o_totalprice + {PRICE_BUMP}, o_orderdate + INTERVAL 30 DAY
  FROM orders WHERE o_orderkey % 7 = 0
)
SELECT o_orderkey, price, valid_from AS effective_from
FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY o_orderkey
              ORDER BY valid_from DESC, price DESC) AS rn
  FROM changes
)
WHERE rn = 1
"""


# ---------------------------------------------------------------------------
# Takedown / right-to-be-forgotten propagation
# ---------------------------------------------------------------------------

# Takedown list = md5-bucket < TAKEDOWN_PCT of doc ids (a deterministic,
# scale-relative stand-in for an external removal list).
TAKEDOWN_PCT = 3


def q_takedown_propagation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Takedown/right-to-be-forgotten propagation with an audit trail: an
    explicit removal list of document ids (copyright takedowns, opt-outs,
    PII erasure orders) must cascade through EVERY derived asset — here
    the text corpus and its embedding table (vec_id keys the same
    documents) — and governance wants per-table before/removed/after
    counts as the deletion receipt.

    The removal is expressed as a LEFT ANTI join against the broadcast
    takedown list — the real shape when the list arrives externally (a
    predicate can't express an arbitrary id list; an anti join always
    can). At 100 TB removal lists are thousands-to-millions of ids:
    comfortably broadcastable, so neither fact table shuffles; the
    per-table counts are map-side-combinable global aggregates over the
    anti-joined survivors. Table formats turn the same plan into
    copy-on-write file rewrites; the dataframe semantics are what the
    cross-engine gate can verify.

    Output: one audit row per table — table_name, n_before, n_removed,
    n_after (n_before = n_removed + n_after by construction; the crafted
    test asserts it, the gate hash-checks the values)."""
    docs = load_table(spark, sf_dir, "documents")
    emb = load_table(spark, sf_dir, "embeddings")
    takedown = docs.select("doc_id").filter(
        (
            F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 15), 16, 10)
            .cast("bigint")
            % 100
        )
        < TAKEDOWN_PCT
    )

    def audit(table: DataFrame, key: str, name: str) -> DataFrame:
        keep = table.join(
            F.broadcast(takedown), table[key] == takedown["doc_id"], "left_anti"
        )
        n_before = table.agg(F.count(F.lit(1)).alias("n")).select(
            F.lit(name).alias("table_name"), F.col("n").alias("n_before")
        )
        n_after = keep.agg(F.count(F.lit(1)).alias("n_after"))
        return n_before.crossJoin(n_after).select(
            "table_name",
            "n_before",
            (F.col("n_before") - F.col("n_after")).alias("n_removed"),
            "n_after",
        )

    return audit(docs, "doc_id", "documents").unionByName(
        audit(emb, "vec_id", "embeddings")
    )


def _sql_takedown() -> str:
    from us_flight_bigdata_dashboard_spark.operators.dedup import _sql_hex_to_int

    hex15 = _sql_hex_to_int("md5(CAST(doc_id AS VARCHAR))", 1, 15)
    return f"""
WITH takedown AS (
  SELECT doc_id FROM documents
  WHERE ({hex15} % 100) < {TAKEDOWN_PCT}
)
SELECT 'documents' AS table_name,
       (SELECT COUNT(*) FROM documents) AS n_before,
       (SELECT COUNT(*) FROM documents WHERE doc_id IN (SELECT doc_id FROM takedown)) AS n_removed,
       (SELECT COUNT(*) FROM documents WHERE doc_id NOT IN (SELECT doc_id FROM takedown)) AS n_after
UNION ALL
SELECT 'embeddings',
       (SELECT COUNT(*) FROM embeddings),
       (SELECT COUNT(*) FROM embeddings WHERE vec_id IN (SELECT doc_id FROM takedown)),
       (SELECT COUNT(*) FROM embeddings WHERE vec_id NOT IN (SELECT doc_id FROM takedown))
"""


# ---------------------------------------------------------------------------
# Deletion-vector merge-on-read scan (Delta DV / Iceberg positional deletes)
# ---------------------------------------------------------------------------

DV_FILE_ROWS = 1000  # rows per simulated data file
DV_SAMPLE_MOD = 20  # ~5% of rows carry a deletion-vector entry


def q_deletion_vector_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Merge-on-read scan under POSITIONAL DELETION VECTORS — the modern
    lakehouse delete path (Delta deletion vectors / Iceberg positional
    delete files): instead of rewriting data files, a side table of
    (file, position) tombstones is anti-joined into every read until
    compaction folds it in. Files are orderkey ranges; positions are the
    in-file row_number; the DV is a deterministic ~5% md5 sample. Output
    is the per-file read-path receipt: rows before, tombstones applied,
    rows served, and a mod-2^62 digest of surviving keys — a dropped or
    resurrected row anywhere flips the digest.

    Scale shape: the anti-join is keyed on (file_id, pos) — both sides
    partition on the same compound key, and the DV side is a few percent
    of one file's rows per file (broadcast-or-shuffle decided by AQE; no
    hint, the DV grows with deletes). The per-file rollup reuses the
    file_id partitioning. The window assigning in-file positions is
    file-partitioned — bounded by DV_FILE_ROWS, never global."""
    from pyspark.sql import Window

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        (F.col("o_orderkey") / F.lit(DV_FILE_ROWS)).cast("bigint").alias("file_id"),
    )
    pos_w = Window.partitionBy("file_id").orderBy("o_orderkey")
    base = orders.withColumn("pos", F.row_number().over(pos_w))
    dv = base.filter(
        F.conv(F.substring(F.md5(F.col("o_orderkey").cast("string")), 1, 8), 16, 10)
        .cast("bigint")
        % DV_SAMPLE_MOD
        == 0
    ).select("file_id", "pos")
    survivors = base.join(dv, ["file_id", "pos"], "left_anti")
    before = base.groupBy("file_id").agg(F.count(F.lit(1)).alias("rows_before"))
    after = survivors.groupBy("file_id").agg(
        F.count(F.lit(1)).alias("rows_served"),
        F.sum(
            F.conv(F.substring(F.md5(F.col("o_orderkey").cast("string")), 1, 15), 16, 10)
            .cast("bigint")
            % F.lit(2**40)  # per-row cap: 1e3 rows/file * 2^40 << 2^63,
            # so the per-file long SUM cannot overflow under ANSI mode
        ).alias("digest_sum"),
    )
    return (
        before.join(after, "file_id")
        .select(
            "file_id",
            F.col("rows_before").cast("long").alias("rows_before"),
            (F.col("rows_before") - F.col("rows_served")).cast("long").alias(
                "tombstones_applied"
            ),
            F.col("rows_served").cast("long").alias("rows_served"),
            (F.col("digest_sum") % F.lit(2**62)).cast("long").alias("digest"),
        )
        .orderBy("file_id")
    )


def _sql_deletion_vector() -> str:
    from us_flight_bigdata_dashboard_spark.operators.dedup import _sql_hex_to_int

    h8 = _sql_hex_to_int("md5(CAST(o_orderkey AS VARCHAR))", 1, 8)
    h15 = _sql_hex_to_int("md5(CAST(o_orderkey AS VARCHAR))", 1, 15)
    return f"""
WITH base AS (
  SELECT o_orderkey,
         CAST(o_orderkey // {DV_FILE_ROWS} AS BIGINT) AS file_id,
         ROW_NUMBER() OVER (PARTITION BY o_orderkey // {DV_FILE_ROWS}
                            ORDER BY o_orderkey) AS pos
  FROM orders
), dv AS (
  SELECT file_id, pos FROM base WHERE {h8} % {DV_SAMPLE_MOD} = 0
), survivors AS (
  SELECT b.* FROM base b ANTI JOIN dv USING (file_id, pos)
), before AS (
  SELECT file_id, COUNT(*) AS rows_before FROM base GROUP BY file_id
), after AS (
  SELECT file_id, COUNT(*) AS rows_served,
         SUM({h15} % {2**40}) AS digest_sum
  FROM survivors GROUP BY file_id
)
SELECT b.file_id,
       CAST(b.rows_before AS BIGINT) AS rows_before,
       CAST(b.rows_before - a.rows_served AS BIGINT) AS tombstones_applied,
       CAST(a.rows_served AS BIGINT) AS rows_served,
       CAST(a.digest_sum % {2**62} AS BIGINT) AS digest
FROM before b JOIN after a USING (file_id)
ORDER BY file_id
"""


# ---------------------------------------------------------------------------
# SCD2 point-in-time (AS OF) fact resolution
# ---------------------------------------------------------------------------


def q_scd2_point_in_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time resolution of facts against the SCD2 dimension built
    by ``q_scd2_history``: each line item looks up the price version
    valid AT ITS SHIP TIME (valid_from ≤ ship < valid_to, half-open, NULL
    = still open) — the consumption side of SCD2, and the join every
    "what did the customer actually see that day" audit runs. Returned
    per resolved version: line-item count and exact resolved-price cents
    (so a wrong-version resolution shifts the sum and fails the gate).

    Scale shape: the interval predicate rides a KEY-LOCAL equi-join on
    the business key (sort-merge at 100 TB; versions-per-key is tiny and
    bounded, so the post-join interval filter is per-key constant work) —
    the PIT join never degenerates into the time-only range join
    (``asof_join``) precisely because the key equality carries it.
    Every line item must resolve to EXACTLY one version by construction
    (intervals partition [orderdate, ∞) and ship ≥ order date); the
    n_lineitems sum equals the fact count, which the oracle enforces
    implicitly through the version-level counts.
    """
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    hist = q_scd2_history(spark, sf_dir)
    j = li.join(
        hist,
        (F.col("l_orderkey") == hist.o_orderkey)
        & (F.col("l_shipdate") >= F.col("valid_from"))
        & (F.col("valid_to").isNull() | (F.col("l_shipdate") < F.col("valid_to"))),
    )
    return (
        j.groupBy("version")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_lineitems"),
            F.sum(F.round(F.col("price") * 100, 0).cast("bigint"))
            .cast("long")
            .alias("sum_price_cents"),
        )
        .orderBy("version")
    )


_ORACLE_SCD2_PIT = f"""
WITH changes AS (
  SELECT o_orderkey, o_totalprice AS price, o_orderdate AS valid_from FROM orders
  UNION ALL
  SELECT o_orderkey, o_totalprice + {{PRICE_BUMP}}, o_orderdate + INTERVAL 30 DAY
  FROM orders WHERE o_orderkey % 7 = 0
), hist AS (
  SELECT o_orderkey, price, valid_from,
         LEAD(valid_from) OVER w AS valid_to,
         ROW_NUMBER() OVER w AS version
  FROM changes
  WINDOW w AS (PARTITION BY o_orderkey ORDER BY valid_from ASC)
)
SELECT version,
       CAST(COUNT(*) AS BIGINT) AS n_lineitems,
       CAST(SUM(CAST(ROUND(price * 100, 0) AS BIGINT)) AS BIGINT) AS sum_price_cents
FROM lineitem
JOIN hist ON l_orderkey = o_orderkey
         AND l_shipdate >= valid_from
         AND (valid_to IS NULL OR l_shipdate < valid_to)
GROUP BY 1
ORDER BY version
""".format(PRICE_BUMP=PRICE_BUMP)


# ---------------------------------------------------------------------------
# SCD2 interval-integrity audit (gaps / overlaps / tiling)
# ---------------------------------------------------------------------------


def q_scd2_interval_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Integrity audit of the SCD2 dimension that ``q_scd2_point_in_time``
    trusts: per business key the half-open validity intervals must TILE —
    consecutive versions meet exactly (no gap: a fact timestamp falls
    into nothing; no overlap: it resolves twice), exactly one open
    current version. Completes the SCD2 triangle (build → consume →
    audit); in a lakehouse nothing enforces this DDL-style, so the audit
    IS the constraint. Output: one row per version-count class with key
    counts and violation totals (all-zero violations = the contract; the
    per-class layout keeps the row set data-dependent rather than a
    constant, so the gate still checks real values).

    Scale shape: one keyed window pass (lead over the version order — the
    same shuffle the build itself uses) then a two-level rollup; nothing
    data-sized after the window.
    """
    from pyspark.sql import Window

    hist = q_scd2_history(spark, sf_dir)
    w = Window.partitionBy("o_orderkey").orderBy("valid_from")
    checked = hist.select(
        "o_orderkey",
        "valid_from",
        "valid_to",
        "is_current",
        F.lead("valid_from").over(w).alias("next_from"),
    )
    per_key = checked.groupBy("o_orderkey").agg(
        F.count(F.lit(1)).cast("long").alias("n_versions"),
        F.sum(
            (
                F.col("next_from").isNotNull()
                & (F.col("valid_to") != F.col("next_from"))
            ).cast("long")
        )
        .cast("long")
        .alias("n_tiling_breaks"),
        F.sum(F.col("is_current").cast("long")).cast("long").alias("n_open"),
    )
    return (
        per_key.groupBy("n_versions")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_keys"),
            F.sum("n_tiling_breaks").cast("long").alias("tiling_breaks"),
            F.sum((F.col("n_open") != 1).cast("long"))
            .cast("long")
            .alias("open_version_violations"),
        )
        .orderBy("n_versions")
    )


_ORACLE_SCD2_AUDIT = f"""
WITH changes AS (
  SELECT o_orderkey, o_totalprice AS price, o_orderdate AS valid_from FROM orders
  UNION ALL
  SELECT o_orderkey, o_totalprice + {PRICE_BUMP}, o_orderdate + INTERVAL 30 DAY
  FROM orders WHERE o_orderkey % 7 = 0
), hist AS (
  SELECT o_orderkey, valid_from,
         LEAD(valid_from) OVER w AS valid_to,
         CAST(LEAD(valid_from) OVER w IS NULL AS INTEGER) AS is_current
  FROM changes
  WINDOW w AS (PARTITION BY o_orderkey ORDER BY valid_from ASC)
), checked AS (
  SELECT o_orderkey, valid_from, valid_to, is_current,
         LEAD(valid_from) OVER (PARTITION BY o_orderkey ORDER BY valid_from)
           AS next_from
  FROM hist
), per_key AS (
  SELECT o_orderkey,
         CAST(COUNT(*) AS BIGINT) AS n_versions,
         CAST(SUM(CASE WHEN next_from IS NOT NULL AND valid_to <> next_from
                       THEN 1 ELSE 0 END) AS BIGINT) AS n_tiling_breaks,
         CAST(SUM(is_current) AS BIGINT) AS n_open
  FROM checked GROUP BY 1
)
SELECT n_versions,
       CAST(COUNT(*) AS BIGINT) AS n_keys,
       CAST(SUM(n_tiling_breaks) AS BIGINT) AS tiling_breaks,
       CAST(SUM(CASE WHEN n_open <> 1 THEN 1 ELSE 0 END) AS BIGINT)
         AS open_version_violations
FROM per_key
GROUP BY 1
ORDER BY n_versions
"""



# ---------------------------------------------------------------------------
# Incremental materialized-view maintenance (round 8)
# ---------------------------------------------------------------------------

MV_DEL_MOD = 97   # deterministic CDC simulation: delete keys % 97 == 0
MV_INS_MOD = 89   # insert modified copies of keys % 89 == 0


def q_matview_delta_maintenance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental maintenance of an additive materialized view: the MV
    (orders per priority: count + revenue cents) is updated by a CDC
    delta batch — deletes as multiplicity −1, inserts as +1 — WITHOUT
    rescanning the base table, and the gate verifies the delta ALGEBRA
    against a full recompute over the modified table (the oracle). This
    is the view-maintenance contract every warehouse MV / streaming agg
    relies on (additive aggregates form a commutative group, so apply-
    delta ≡ recompute); a sign error, a double-application, or a missed
    anti-join shows up as a hash mismatch. ``q_mv_incremental`` above
    covers the APPEND-ONLY refresh (partition partials merged); this
    entry covers the general CDC case — deletes need the group INVERSE
    (multiplicity −1), which append-only merging cannot express.

    The CDC batch is hash-deterministic: delete every order with key ≡ 0
    (mod {d}); insert a modified copy (+10.00 total) of every order with
    key ≡ 0 (mod {i}) under an offset key. Scale shape: the base MV is
    one map-side-combinable agg (in production it already EXISTS — here
    it is built once to have a base state); the delta path aggregates
    ONLY the delta rows and merges on the |priorities| frame via one
    broadcast-sized outer join. Counts/cents are exact integers.
    """
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority", "o_totalprice"
    )
    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    base_mv = orders.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(cents.cast("decimal(38,0)")).cast("long").alias("revenue_cents"),
    )
    deletes = orders.filter(F.col("o_orderkey") % MV_DEL_MOD == 0).select(
        "o_orderpriority", F.lit(-1).alias("mult"), cents.alias("cents")
    )
    ins_cents = F.round((F.col("o_totalprice") + F.lit(10.0)) * 100).cast("long")
    inserts = orders.filter(F.col("o_orderkey") % MV_INS_MOD == 0).select(
        "o_orderpriority", F.lit(1).alias("mult"), ins_cents.alias("cents")
    )
    delta = deletes.unionByName(inserts)
    delta_mv = delta.groupBy("o_orderpriority").agg(
        F.sum("mult").cast("long").alias("d_n"),
        F.sum((F.col("mult") * F.col("cents")).cast("decimal(38,0)"))
        .cast("long")
        .alias("d_cents"),
        F.count(F.lit(1)).alias("n_delta_rows"),
    )
    return (
        base_mv.join(delta_mv, "o_orderpriority", "full_outer")
        .select(
            "o_orderpriority",
            (F.coalesce(F.col("n_orders"), F.lit(0)) + F.coalesce(F.col("d_n"), F.lit(0)))
            .cast("long")
            .alias("n_orders"),
            (
                F.coalesce(F.col("revenue_cents"), F.lit(0))
                + F.coalesce(F.col("d_cents"), F.lit(0))
            )
            .cast("long")
            .alias("revenue_cents"),
            F.coalesce(F.col("n_delta_rows"), F.lit(0)).cast("long").alias("n_delta_rows"),
        )
        .orderBy("o_orderpriority")
    )
q_matview_delta_maintenance.__doc__ = q_matview_delta_maintenance.__doc__ and q_matview_delta_maintenance.__doc__.format(d=MV_DEL_MOD, i=MV_INS_MOD)


# The oracle RECOMPUTES from the modified logical table — delta algebra
# must equal recompute, which is the entire point of the entry.
_ORACLE_MATVIEW_DELTA = f"""
WITH modified AS (
  SELECT o_orderpriority, CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents
  FROM orders WHERE o_orderkey % {MV_DEL_MOD} <> 0
  UNION ALL
  SELECT o_orderpriority, CAST(ROUND((o_totalprice + 10.0) * 100) AS BIGINT) AS cents
  FROM orders WHERE o_orderkey % {MV_INS_MOD} = 0
), delta_n AS (
  SELECT o_orderpriority,
         SUM(CASE WHEN o_orderkey % {MV_DEL_MOD} = 0 THEN 1 ELSE 0 END
             + CASE WHEN o_orderkey % {MV_INS_MOD} = 0 THEN 1 ELSE 0 END)
           AS n_delta_rows
  FROM orders
  WHERE o_orderkey % {MV_DEL_MOD} = 0 OR o_orderkey % {MV_INS_MOD} = 0
  GROUP BY 1
), agg AS (
  SELECT o_orderpriority, COUNT(*) AS n_orders,
         CAST(SUM(CAST(cents AS DECIMAL(38,0))) AS BIGINT) AS revenue_cents
  FROM modified GROUP BY 1
)
SELECT a.o_orderpriority,
       CAST(a.n_orders AS BIGINT) AS n_orders,
       a.revenue_cents,
       CAST(COALESCE(d.n_delta_rows, 0) AS BIGINT) AS n_delta_rows
FROM agg a LEFT JOIN delta_n d USING (o_orderpriority)
ORDER BY a.o_orderpriority
"""


QUERIES = {
    "matview_delta_maintenance": q_matview_delta_maintenance,
    "merge_upsert": q_merge_upsert,
    "mv_incremental": q_mv_incremental,
    "scd2_history": q_scd2_history,
    "cdc_latest": q_cdc_latest,
    "takedown_propagation": q_takedown_propagation,
    "deletion_vector_scan": q_deletion_vector_scan,
    "scd2_point_in_time": q_scd2_point_in_time,
    "scd2_interval_audit": q_scd2_interval_audit,
}

ORACLE = {
    "matview_delta_maintenance": _ORACLE_MATVIEW_DELTA,
    "merge_upsert": _ORACLE_MERGE_UPSERT,
    "mv_incremental": _ORACLE_MV_INCREMENTAL,
    "scd2_history": _ORACLE_SCD2_HISTORY,
    "cdc_latest": _ORACLE_CDC_LATEST,
    "takedown_propagation": _sql_takedown(),
    "deletion_vector_scan": _sql_deletion_vector(),
    "scd2_point_in_time": _ORACLE_SCD2_PIT,
    "scd2_interval_audit": _ORACLE_SCD2_AUDIT,
}
