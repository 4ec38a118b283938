"""Physical-layout and runtime-filter operators: the techniques that keep a
100 TB table scannable — bloom-filter join pruning, Z-order clustering for
data skipping, and small-file compaction planning.

The reference (single MySQL instance) never needs these; a lakehouse engine
does. Each is expressed as a *measurable* DataFrame operator so its effect
is part of the correctness matrix: the bloom operator reports its own
false-positive rate, the Z-order operator reports per-bucket min/max ranges
(the skipping statistics a reader would prune on), and the compaction
planner emits the bin assignment a rewrite job would execute.

Determinism: all hashing is the portable md5-affine construction shared
with the dedup family (first 15 hex digits → int64 — exact on both
engines); everything else is integer arithmetic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from us_flight_bigdata_dashboard_spark.operators.dedup import _sql_hex_to_int
from us_flight_bigdata_dashboard_spark.sources.catalog import load_table

# ---------------------------------------------------------------------------
# Bloom-filter semi join (runtime filter pushdown, made explicit)
# ---------------------------------------------------------------------------

BLOOM_BITS = 4096  # m: filter size in bits
BLOOM_HASHES = 3  # k: hash functions
BLOOM_SEGMENT = "BUILDING"


def _bloom_pos(col, k: int):
    """k-th bloom position of an int key: md5-affine hash mod BLOOM_BITS."""
    h = F.md5(F.concat_ws(":", F.lit(str(k)), col.cast("string")))
    return F.conv(F.substring(h, 1, 15), 16, 10).cast("bigint") % BLOOM_BITS


def _sql_bloom_pos(expr: str, k: int) -> str:
    return (
        _sql_hex_to_int(f"md5('{k}:' || CAST({expr} AS VARCHAR))", 1, 15)
        + f" % {BLOOM_BITS}"
    )


def q_bloom_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit bloom-filter runtime join pruning: build a {BLOOM_BITS}-bit,
    {BLOOM_HASHES}-hash bloom filter from the build side (customers in one
    market segment) and probe every order against it BEFORE the real join,
    reporting orders scanned / bloom-passed / true matches / false
    positives and the measured false-positive rate.

    This is the operator form of what Spark's own
    ``spark.sql.optimizer.runtime.bloomFilter.enabled`` injects invisibly
    (and what every warehouse calls a runtime filter or join pruning
    sideways pass): at 100 TB the probe-side scan discards non-joining rows
    for the cost of k narrow hash expressions per row, before any shuffle.

    Scale shape: the build side reduces to ONE row holding the filter as a
    DENSE length-m 0/1 array (densified once from the set-bit positions on
    that single row — O(m²) on one row, negligible), which broadcasts; the
    probe is then k O(1) ``element_at`` lookups fused into the scan — zero
    row-proportional shuffle and constant work per probe row. (The first
    draft probed the sparse position list with ``array_contains``: a linear
    scan of up to m elements per hash per row — ~1.8B comparisons at sf0.1,
    3.2s; the dense array cut the probe to O(k).) The final verification
    join broadcasts the dimension keys (dimension-sized by construction).
    The oracle carries the identical bit positions as a scalar-subquery
    list, so the reported counts — false positives included — match
    bit-for-bit across engines regardless of the physical representation.
    """
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")

    dim_keys = customer.filter(F.col("c_mktsegment") == BLOOM_SEGMENT).select("c_custkey")
    bits_row = (
        dim_keys.select(
            F.explode(
                F.array(*[_bloom_pos(F.col("c_custkey"), k) for k in range(BLOOM_HASHES)])
            ).alias("pos")
        )
        .agg(F.collect_set("pos").alias("_bits"))
        .select(
            F.transform(
                F.sequence(F.lit(0), F.lit(BLOOM_BITS - 1)),
                lambda i: F.array_contains(F.col("_bits"), i.cast("bigint")).cast("int"),
            ).alias("_dense")
        )
    )
    bloom_pass = F.lit(True)
    for k in range(BLOOM_HASHES):
        bloom_pass = bloom_pass & (
            F.element_at(
                F.col("_dense"), (_bloom_pos(F.col("o_custkey"), k) + 1).cast("int")
            )
            == 1
        )
    probe = orders.crossJoin(F.broadcast(bits_row)).withColumn("_bloom_pass", bloom_pass)
    dim_flag = dim_keys.withColumn("_true", F.lit(1))
    flagged = probe.join(
        F.broadcast(dim_flag), probe["o_custkey"] == dim_flag["c_custkey"], "left"
    )
    return flagged.agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(F.when(F.col("_bloom_pass"), 1).otherwise(0)).alias("n_bloom_pass"),
        F.sum(F.coalesce(F.col("_true"), F.lit(0))).alias("n_true_match"),
        F.sum(F.when(F.col("_bloom_pass") & F.col("_true").isNull(), 1).otherwise(0)).alias(
            "n_false_pos"
        ),
        (
            F.sum(F.when(F.col("_bloom_pass") & F.col("_true").isNull(), 1).otherwise(0))
            / F.sum(F.when(F.col("_true").isNull(), 1).otherwise(0))
        ).alias("false_pos_rate"),
    )


def _sql_bloom() -> str:
    pos_union = " UNION ALL ".join(
        f"SELECT {_sql_bloom_pos('c_custkey', k)} AS pos FROM dim"
        for k in range(BLOOM_HASHES)
    )
    probe_conj = " AND ".join(
        f"list_contains((SELECT bits FROM bloom), {_sql_bloom_pos('o_custkey', k)})"
        for k in range(BLOOM_HASHES)
    )
    return f"""
WITH dim AS (
  SELECT c_custkey FROM customer WHERE c_mktsegment = '{BLOOM_SEGMENT}'
),
bloom AS (
  SELECT list(DISTINCT pos) AS bits FROM ({pos_union})
),
probe AS (
  SELECT o.o_custkey,
         ({probe_conj}) AS bloom_pass,
         (d.c_custkey IS NOT NULL) AS true_match
  FROM orders o LEFT JOIN dim d ON o.o_custkey = d.c_custkey
)
SELECT COUNT(*) AS n_orders,
       CAST(SUM(CASE WHEN bloom_pass THEN 1 ELSE 0 END) AS BIGINT) AS n_bloom_pass,
       CAST(SUM(CASE WHEN true_match THEN 1 ELSE 0 END) AS BIGINT) AS n_true_match,
       CAST(SUM(CASE WHEN bloom_pass AND NOT true_match THEN 1 ELSE 0 END) AS BIGINT)
         AS n_false_pos,
       CAST(SUM(CASE WHEN bloom_pass AND NOT true_match THEN 1 ELSE 0 END) AS DOUBLE)
         / SUM(CASE WHEN NOT true_match THEN 1 ELSE 0 END) AS false_pos_rate
FROM probe
"""


# ---------------------------------------------------------------------------
# Z-order clustering statistics
# ---------------------------------------------------------------------------

Z_DIM_BITS = 8  # bits per dimension (two dims → 16-bit z-value)
Z_BUCKETS = 16  # files/buckets the curve is cut into


def _zvalue(x, y):
    """Interleave the low Z_DIM_BITS of two ints: bit i of x → bit 2i,
    bit i of y → bit 2i+1. Pure integer arithmetic, portable."""
    z = F.lit(0)
    for i in range(Z_DIM_BITS):
        z = z + F.shiftright(x, i).bitwiseAND(F.lit(1)) * F.lit(1 << (2 * i))
        z = z + F.shiftright(y, i).bitwiseAND(F.lit(1)) * F.lit(1 << (2 * i + 1))
    return z


def _sql_zvalue(x: str, y: str) -> str:
    terms = []
    for i in range(Z_DIM_BITS):
        terms.append(f"((({x} >> {i}) & 1) * {1 << (2 * i)})")
        terms.append(f"((({y} >> {i}) & 1) * {1 << (2 * i + 1)})")
    return "(" + " + ".join(terms) + ")"


def q_zorder_cluster(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order (Morton curve) clustering statistics: map each order onto a
    16-bit Z-value interleaving (customer-key low byte, order-day-of-year
    low byte), cut the curve into {Z_BUCKETS} equal Z-ranges ("files"), and
    report each bucket's row count and per-dimension min/max — exactly the
    column statistics a parquet/lakehouse reader prunes on.

    Why it matters at 100 TB: sorting by a single column gives perfect
    skipping on that column and none on the other; the Z-curve bounds BOTH
    dimensions per file (each bucket's min/max span ≈ 1/√buckets of each
    domain), so two-predicate queries skip most files. This operator is the
    measurable core of `OPTIMIZE ... ZORDER BY`; a real rewrite would
    ``repartitionByRange(zvalue)`` and write — same computation, plus a
    sink.

    Scale shape: the Z-value is a narrow integer expression fused into the
    scan; bucketing is ``z >> (16 - log2(buckets))`` (static range cut, no
    ntile/sort needed); one hash-agg to {Z_BUCKETS} rows. Zero joins, zero
    row-proportional shuffle.
    """
    orders = load_table(spark, sf_dir, "orders")
    x = (F.col("o_custkey") % (1 << Z_DIM_BITS)).cast("int")
    y = (F.dayofyear(F.col("o_orderdate")) % (1 << Z_DIM_BITS)).cast("int")
    shift = 2 * Z_DIM_BITS - Z_BUCKETS.bit_length() + 1  # 16-4 = 12
    return (
        orders.withColumn("x", x)
        .withColumn("y", y)
        .withColumn("zbucket", F.shiftright(_zvalue(F.col("x"), F.col("y")), shift))
        .groupBy("zbucket")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min("x").alias("min_custkey_byte"),
            F.max("x").alias("max_custkey_byte"),
            F.min("y").alias("min_doy_byte"),
            F.max("y").alias("max_doy_byte"),
        )
    )


def _sql_zorder() -> str:
    shift = 2 * Z_DIM_BITS - Z_BUCKETS.bit_length() + 1
    return f"""
WITH base AS (
  SELECT CAST(o_custkey % {1 << Z_DIM_BITS} AS INTEGER) AS x,
         CAST(dayofyear(o_orderdate) % {1 << Z_DIM_BITS} AS INTEGER) AS y
  FROM orders
)
SELECT ({_sql_zvalue("x", "y")} >> {shift}) AS zbucket,
       COUNT(*) AS n_rows,
       MIN(x) AS min_custkey_byte, MAX(x) AS max_custkey_byte,
       MIN(y) AS min_doy_byte, MAX(y) AS max_doy_byte
FROM base
GROUP BY zbucket
"""


# ---------------------------------------------------------------------------
# Small-file compaction planning
# ---------------------------------------------------------------------------

COMPACT_TARGET_CHARS = 4096  # target output "file" size (chars as byte proxy)


def q_compaction_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-file compaction planning: assign each document ("input file")
    to an output bin so consecutive documents fill ~{COMPACT_TARGET_CHARS}
    chars per bin, per source — the planning half of the lakehouse
    `OPTIMIZE`/rewrite-data-files job that fixes the small-files problem
    (driver-side file listing; executor-side rewrite).

    Bin rule: exclusive running sum of sizes in (source, doc_id) order,
    integer-divided by the target — the streaming first-fit packing that
    needs ONE window pass, no driver loop, and is deterministic for the
    oracle (unlike best-fit heuristics, which are order-sensitive and
    sequential).

    Scale shape: one shuffle to partition by source, a running-sum window
    inside each partition, then a re-aggregation to one row per output bin.
    In production each source's plan is independent — embarrassingly
    parallel across partitions; for single giant sources, split the window
    key by date as `sequence_pack` does.
    """
    docs = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy("source").orderBy("doc_id")
    cum_before = F.coalesce(
        F.sum("n_chars").over(w.rowsBetween(Window.unboundedPreceding, -1)), F.lit(0)
    )
    return (
        docs.select("source", "doc_id", "n_chars")
        .withColumn("bin_id", F.floor(cum_before / COMPACT_TARGET_CHARS).cast("bigint"))
        .groupBy("source", "bin_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("bin_chars"),
            F.min("doc_id").alias("first_doc"),
            F.max("doc_id").alias("last_doc"),
        )
    )


_ORACLE_COMPACTION_PLAN = f"""
WITH planned AS (
  SELECT source, doc_id, n_chars,
         CAST(floor(COALESCE(SUM(n_chars) OVER (
             PARTITION BY source ORDER BY doc_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           / {COMPACT_TARGET_CHARS}) AS BIGINT) AS bin_id
  FROM documents
)
SELECT source, bin_id, COUNT(*) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS bin_chars,
       MIN(doc_id) AS first_doc, MAX(doc_id) AS last_doc
FROM planned
GROUP BY source, bin_id
"""


# ---------------------------------------------------------------------------
# Parquet footer layout statistics (per-column encoding effectiveness)
# ---------------------------------------------------------------------------

# Fixed staging path so the STATIC oracle SQL can reference the same file
# the Spark side wrote — the same staged-artifact pattern as the format
# roundtrips (operators/relational.py). Overwritten per process.
_LAYOUT_STAGE = "/tmp/sg_layout_stats_stage"

LAYOUT_STATS_SCHEMA = (
    "column_name string, n_chunks bigint, n_values bigint, "
    "compressed_bytes bigint, uncompressed_bytes bigint"
)


def q_parquet_layout_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-column parquet layout statistics — the `OPTIMIZE`-time question
    "which columns actually compress, and where do the bytes live?":
    for every column of a freshly written lineitem projection, the number
    of column chunks, value count, and compressed/uncompressed byte totals
    read from the REAL parquet footers (pyarrow metadata walk inside a
    mapInPandas worker — one task per file, the shape that scans a
    100k-file table's footers in parallel without touching data pages).

    The oracle reads the SAME footers through DuckDB's independent
    ``parquet_metadata()`` implementation — two parsers over one physical
    artifact, so a wrong chunk walk, missed row group, or size-field mixup
    on either side breaks the hash. The compression ratio itself is left
    to the reader (one division) to keep the gate integer-exact."""
    import shutil

    shutil.rmtree(_LAYOUT_STAGE, ignore_errors=True)
    (
        load_table(spark, sf_dir, "lineitem")
        .select(
            "l_orderkey", "l_partkey", "l_quantity",
            "l_extendedprice", "l_shipdate", "l_returnflag",
        )
        .coalesce(1)
        .write.mode("overwrite")
        .parquet(_LAYOUT_STAGE)
    )

    import glob as _glob

    files = sorted(_glob.glob(f"{_LAYOUT_STAGE}/part-*.parquet"))
    paths = spark.createDataFrame([(p,) for p in files], "path string").repartition(
        max(len(files), 1)
    )

    def footer_walk(batches):
        import pandas as pd
        import pyarrow.parquet as pq

        for pdf in batches:
            out = {k: [] for k in (
                "column_name", "n_chunks", "n_values",
                "compressed_bytes", "uncompressed_bytes",
            )}
            for path in pdf["path"]:
                meta = pq.ParquetFile(path).metadata
                for rg in range(meta.num_row_groups):
                    row_group = meta.row_group(rg)
                    for ci in range(row_group.num_columns):
                        col = row_group.column(ci)
                        out["column_name"].append(col.path_in_schema)
                        out["n_chunks"].append(1)
                        out["n_values"].append(col.num_values)
                        out["compressed_bytes"].append(col.total_compressed_size)
                        out["uncompressed_bytes"].append(col.total_uncompressed_size)
            yield pd.DataFrame(out)

    return (
        paths.mapInPandas(footer_walk, LAYOUT_STATS_SCHEMA)
        .groupBy("column_name")
        .agg(
            F.sum("n_chunks").alias("n_chunks"),
            F.sum("n_values").alias("n_values"),
            F.sum("compressed_bytes").alias("compressed_bytes"),
            F.sum("uncompressed_bytes").alias("uncompressed_bytes"),
        )
        .orderBy("column_name")
    )


_ORACLE_PARQUET_LAYOUT_STATS = f"""
SELECT path_in_schema AS column_name,
       CAST(COUNT(*) AS BIGINT) AS n_chunks,
       CAST(SUM(num_values) AS BIGINT) AS n_values,
       CAST(SUM(total_compressed_size) AS BIGINT) AS compressed_bytes,
       CAST(SUM(total_uncompressed_size) AS BIGINT) AS uncompressed_bytes
FROM parquet_metadata('{_LAYOUT_STAGE}/part-*.parquet')
GROUP BY 1
ORDER BY 1
"""


# ---------------------------------------------------------------------------
# Hilbert-curve clustering (the better-locality alternative to Z-order)
# ---------------------------------------------------------------------------

H_SIDE = 1 << Z_DIM_BITS  # 256×256 grid, same dims as the Z-order entry


def _hilbert_levels():
    """(s, s², s−1) per refinement level, coarsest first."""
    return [(s, s * s, s - 1) for s in (128, 64, 32, 16, 8, 4, 2, 1)]


def q_hilbert_cluster(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hilbert-curve clustering statistics over the SAME two dimensions as
    ``zorder_cluster`` (customer-key low byte × order day-of-year low
    byte), so the two entries are directly comparable: the Hilbert curve
    has no Z-curve "jumps", so each curve-range file bounds a tighter
    spatial rectangle — the reason Delta/Iceberg ship `OPTIMIZE ...
    HILBERT` next to Z-order. Reports the same per-bucket zone-map stats
    (count + per-dimension min/max).

    The xy→d map is the classic Lawder/Wikipedia iterative rotation,
    computed ONCE on the driver into a 65,536-entry lookup table that
    broadcast-joins onto the scan — the standard space-filling-curve
    implementation at scale (O(1) per row, ~1 MB broadcast). The naive
    alternative — 8 levels of nested CASE column expressions — was
    measured to explode in Catalyst: each level references the previous
    x/y several times, so the tree grows ~4^8 nodes and planning alone
    ran past two minutes. The ORACLE keeps the expression formulation
    (chained CTEs reference columns by NAME, so DuckDB's tree stays
    linear) — two independent formulations of the same curve, which is
    exactly what the cross-engine hash then certifies.

    Scale shape: one broadcast hash join fused into the scan, one
    hash-agg to {Z_BUCKETS} rows."""
    import numpy as np
    import pandas as pd

    # vectorized LUT build: all 256×256 points at once (numpy int64)
    xg, yg = np.meshgrid(
        np.arange(H_SIDE, dtype=np.int64), np.arange(H_SIDE, dtype=np.int64),
        indexing="ij",
    )
    x_, y_, dd = xg.ravel(), yg.ravel(), np.zeros(H_SIDE * H_SIDE, dtype=np.int64)
    for s, s2, sm1 in _hilbert_levels():
        rx = ((x_ & s) > 0).astype(np.int64)
        ry = ((y_ & s) > 0).astype(np.int64)
        dd += s2 * ((3 * rx) ^ ry)
        rot = ry == 0
        flip = rot & (rx == 1)
        x2 = np.where(flip, sm1 - y_, np.where(rot, y_, x_))
        y2 = np.where(flip, sm1 - x_, np.where(rot, x_, y_))
        x_, y_ = x2, y2
    lut_df = spark.createDataFrame(
        pd.DataFrame({"xy": xg.ravel() * H_SIDE + yg.ravel(), "d": dd})
    )
    orders = load_table(spark, sf_dir, "orders")
    df = orders.select(
        (F.col("o_custkey") % H_SIDE).cast("long").alias("x0"),
        (F.dayofyear(F.col("o_orderdate")) % H_SIDE).cast("long").alias("y0"),
    ).withColumn("xy", F.col("x0") * H_SIDE + F.col("y0"))
    shift = 2 * Z_DIM_BITS - Z_BUCKETS.bit_length() + 1  # 16 - 4 = 12
    return (
        df.join(F.broadcast(lut_df), "xy")
        .select("x0", "y0", F.shiftright(F.col("d"), shift).alias("hbucket"))
        .groupBy("hbucket")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min("x0").alias("min_custkey_byte"),
            F.max("x0").alias("max_custkey_byte"),
            F.min("y0").alias("min_doy_byte"),
            F.max("y0").alias("max_doy_byte"),
        )
        .orderBy("hbucket")
    )


def _sql_hilbert() -> str:
    shift = 2 * Z_DIM_BITS - Z_BUCKETS.bit_length() + 1
    ctes = [
        f"l0 AS (SELECT CAST(o_custkey % {H_SIDE} AS BIGINT) AS x,"
        f" CAST(dayofyear(o_orderdate) % {H_SIDE} AS BIGINT) AS y,"
        f" CAST(o_custkey % {H_SIDE} AS BIGINT) AS x0,"
        f" CAST(dayofyear(o_orderdate) % {H_SIDE} AS BIGINT) AS y0,"
        " CAST(0 AS BIGINT) AS d FROM orders)"
    ]
    prev = "l0"
    for i, (s, s2, sm1) in enumerate(_hilbert_levels(), start=1):
        rx = f"(CASE WHEN (x & {s}) > 0 THEN 1 ELSE 0 END)"
        ry = f"(CASE WHEN (y & {s}) > 0 THEN 1 ELSE 0 END)"
        ctes.append(
            f"l{i} AS (SELECT"
            f" CASE WHEN {ry} = 0 THEN (CASE WHEN {rx} = 1 THEN {sm1} - y ELSE y END)"
            f"      ELSE x END AS x,"
            f" CASE WHEN {ry} = 0 THEN (CASE WHEN {rx} = 1 THEN {sm1} - x ELSE x END)"
            f"      ELSE y END AS y,"
            f" x0, y0,"
            f" d + {s2} * xor(3 * {rx}, {ry}) AS d"
            f" FROM {prev})"
        )
        prev = f"l{i}"
    chain = ",\n".join(ctes)
    return f"""
WITH {chain}
SELECT (d >> {shift}) AS hbucket,
       COUNT(*) AS n_rows,
       MIN(x0) AS min_custkey_byte, MAX(x0) AS max_custkey_byte,
       MIN(y0) AS min_doy_byte, MAX(y0) AS max_doy_byte
FROM {prev}
GROUP BY hbucket
ORDER BY hbucket
"""


# ---------------------------------------------------------------------------
# Zone-map file-skipping effectiveness
# ---------------------------------------------------------------------------

SKIP_FILE_ROWS = 1000  # rows per simulated file (orderkey-ranged)
# (label, column, lo, hi) literal predicates probed against the zone maps
SKIP_PREDICATES = [
    ("date_1994", "d", 19940101, 19941231),
    ("date_h1_1995", "d", 19950101, 19950630),
    ("price_low", "p", 0, 50000),
    ("price_band", "p", 100000, 150000),
]


def q_file_skip_effectiveness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zone-map (min/max) file-skipping effectiveness: partition orders
    into orderkey-ranged "files", collect each file's min/max zone maps
    for order date (as yyyymmdd int) and total price (cents), then probe
    fixed range predicates: a file is SKIPPED when its zone interval
    misses the predicate interval — exactly the decision a parquet
    row-group / Iceberg manifest reader makes. Reports, per predicate,
    files scanned vs skipped and how many scanned-file rows actually
    match (the false-positive cost of coarse zones).

    Scale shape: one hash-agg to the file manifest (O(files) rows), then
    a tiny literal-predicate frame broadcast-joined against it; the
    row-level recount aggregates per (file, predicate) map-side. The
    manifest IS the skipping index — nothing row-proportional leaves the
    scan."""
    orders = load_table(spark, sf_dir, "orders").select(
        (F.col("o_orderkey") / F.lit(SKIP_FILE_ROWS)).cast("bigint").alias("file_id"),
        (
            F.year("o_orderdate") * 10000
            + F.month("o_orderdate") * 100
            + F.dayofmonth("o_orderdate")
        ).cast("long").alias("d"),
        (F.col("o_totalprice") * 100).cast("long").alias("p"),
    )
    zones = orders.groupBy("file_id").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.min("d").alias("min_d"),
        F.max("d").alias("max_d"),
        F.min("p").alias("min_p"),
        F.max("p").alias("max_p"),
    )
    preds = orders.sparkSession.createDataFrame(
        SKIP_PREDICATES, "label string, col string, lo long, hi long"
    )
    probed = zones.crossJoin(F.broadcast(preds)).select(
        "label",
        "col",
        "lo",
        "hi",
        "file_id",
        "n_rows",
        F.when(
            F.col("col") == "d",
            (F.col("max_d") < F.col("lo")) | (F.col("min_d") > F.col("hi")),
        )
        .otherwise((F.col("max_p") < F.col("lo")) | (F.col("min_p") > F.col("hi")))
        .cast("int")
        .alias("skipped"),
    )
    matches = (
        orders.crossJoin(F.broadcast(preds))
        .filter(
            F.when(
                F.col("col") == "d",
                F.col("d").between(F.col("lo"), F.col("hi")),
            ).otherwise(F.col("p").between(F.col("lo"), F.col("hi")))
        )
        .groupBy("label")
        .agg(F.count(F.lit(1)).alias("matching_rows"))
    )
    return (
        probed.groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n_files"),
            F.sum("skipped").alias("files_skipped"),
            F.sum(
                F.when(F.col("skipped") == 0, F.col("n_rows")).otherwise(F.lit(0))
            ).alias("rows_scanned"),
        )
        .join(matches, "label", "left")
        .select(
            "label",
            F.col("n_files").cast("long").alias("n_files"),
            F.col("files_skipped").cast("long").alias("files_skipped"),
            F.col("rows_scanned").cast("long").alias("rows_scanned"),
            F.coalesce(F.col("matching_rows"), F.lit(0)).cast("long").alias(
                "matching_rows"
            ),
        )
        .orderBy("label")
    )


def _sql_file_skip() -> str:
    preds = " UNION ALL ".join(
        f"SELECT '{lbl}' AS label, '{c}' AS col, CAST({lo} AS BIGINT) AS lo,"
        f" CAST({hi} AS BIGINT) AS hi"
        for lbl, c, lo, hi in SKIP_PREDICATES
    )
    return f"""
WITH base AS (
  SELECT CAST(o_orderkey // {SKIP_FILE_ROWS} AS BIGINT) AS file_id,
         CAST(year(o_orderdate) * 10000 + month(o_orderdate) * 100
              + day(o_orderdate) AS BIGINT) AS d,
         CAST(o_totalprice * 100 AS BIGINT) AS p
  FROM orders
), zones AS (
  SELECT file_id, COUNT(*) AS n_rows,
         MIN(d) AS min_d, MAX(d) AS max_d, MIN(p) AS min_p, MAX(p) AS max_p
  FROM base GROUP BY file_id
), preds AS ({preds}),
probed AS (
  SELECT p.label, z.file_id, z.n_rows,
         CASE WHEN p.col = 'd'
              THEN CASE WHEN z.max_d < p.lo OR z.min_d > p.hi THEN 1 ELSE 0 END
              ELSE CASE WHEN z.max_p < p.lo OR z.min_p > p.hi THEN 1 ELSE 0 END
         END AS skipped
  FROM zones z CROSS JOIN preds p
), matches AS (
  SELECT p.label, COUNT(*) AS matching_rows
  FROM base b CROSS JOIN preds p
  WHERE CASE WHEN p.col = 'd' THEN b.d BETWEEN p.lo AND p.hi
             ELSE b.p BETWEEN p.lo AND p.hi END
  GROUP BY p.label
)
SELECT pr.label,
       CAST(COUNT(*) AS BIGINT) AS n_files,
       CAST(SUM(pr.skipped) AS BIGINT) AS files_skipped,
       CAST(SUM(CASE WHEN pr.skipped = 0 THEN pr.n_rows ELSE 0 END) AS BIGINT)
         AS rows_scanned,
       CAST(COALESCE(MAX(m.matching_rows), 0) AS BIGINT) AS matching_rows
FROM probed pr LEFT JOIN matches m USING (label)
GROUP BY pr.label
ORDER BY pr.label
"""


QUERIES = {
    "bloom_semi_join": q_bloom_semi_join,
    "zorder_cluster": q_zorder_cluster,
    "compaction_plan": q_compaction_plan,
    "parquet_layout_stats": q_parquet_layout_stats,
    "hilbert_cluster": q_hilbert_cluster,
    "file_skip_effectiveness": q_file_skip_effectiveness,
}

ORACLE = {
    "bloom_semi_join": _sql_bloom(),
    "zorder_cluster": _sql_zorder(),
    "compaction_plan": _ORACLE_COMPACTION_PLAN,
    "parquet_layout_stats": _ORACLE_PARQUET_LAYOUT_STATS,
    "hilbert_cluster": _sql_hilbert(),
    "file_skip_effectiveness": _sql_file_skip(),
}
