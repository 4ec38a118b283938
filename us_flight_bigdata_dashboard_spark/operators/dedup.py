"""Deduplication operators over ``documents`` (north-star extension —
first-class components for a 100 TB training-data pipeline).

Five dedup families, all expressed as declarative DataFrame plans (no UDFs):

  exact            — md5 hash-groupBy (one shuffle on the hash)
  normalized exact — canonical-form fingerprint groupBy
  MinHash + LSH    — shingle → 16 minhashes → 4 bands → bucket-join candidates
  n-gram Jaccard   — inverted shingle index self-join, exact Jaccard
  SimHash          — 16-bit signature from token-hash sign sums

Portability trick for the oracle: all hash material is md5 hex *strings*
(identical in Spark and DuckDB); MinHash takes lexicographic minima of
``md5(seed || '|' || shingle)`` so no integer-hash compatibility is needed.

Scale notes: exact/normalized dedup is a single hash-partition shuffle on
the digest — the canonical 100 TB pattern. MinHash-LSH joins only within
band buckets (candidates ≪ n²); the all-pairs Jaccard is intentionally
presented as the *verification* stage over LSH candidates, with a top-k cap
here so the standalone query stays bounded.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from us_flight_bigdata_dashboard_spark.functions.exact import dsum, sql_dsum
from us_flight_bigdata_dashboard_spark.sources.catalog import load_table

N_MINHASH = 16
N_BANDS = 4
ROWS_PER_BAND = N_MINHASH // N_BANDS
SHINGLE_WORDS = 3


# ---------------------------------------------------------------------------
# Exact dedup (hash-groupBy)
# ---------------------------------------------------------------------------

def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact duplicate groups: md5(text) → keeper = min doc_id, copy count.
    Only the 16-byte digest shuffles, never the payload."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select(F.md5("text").alias("text_hash"), "doc_id")
        .groupBy("text_hash")
        .agg(F.min("doc_id").alias("keep_doc_id"), F.count(F.lit(1)).alias("n_copies"))
    )


_ORACLE_DEDUP_EXACT = """
SELECT md5(text) AS text_hash,
       MIN(doc_id) AS keep_doc_id,
       COUNT(*) AS n_copies
FROM documents
GROUP BY 1
"""


def q_dedup_normalized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy-exact dedup on the canonical form (lowercase, punctuation and
    whitespace collapsed) — catches trivially-mutated duplicates."""
    docs = load_table(spark, sf_dir, "documents")
    norm = F.trim(F.regexp_replace(F.regexp_replace(F.lower(F.col("text")), "[^a-z0-9]+", " "), " +", " "))
    return (
        docs.select(F.md5(norm).alias("fingerprint"), "doc_id")
        .groupBy("fingerprint")
        .agg(F.min("doc_id").alias("keep_doc_id"), F.count(F.lit(1)).alias("n_copies"))
    )


_ORACLE_DEDUP_NORMALIZED = """
SELECT md5(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'), ' +', ' ', 'g'))) AS fingerprint,
       MIN(doc_id) AS keep_doc_id,
       COUNT(*) AS n_copies
FROM documents
GROUP BY 1
"""


# ---------------------------------------------------------------------------
# Shingling (shared by MinHash and Jaccard)
# ---------------------------------------------------------------------------

def _shingle_array(n_words: int = SHINGLE_WORDS, toks=None):
    """Column expr: distinct word-``n_words``-gram shingles of ``text`` as
    an array (short docs fall back to one whole-text shingle).

    Pass ``toks`` (a column REFERENCE to an already-materialized token
    array) whenever possible — see ``shingles_exploded`` for why inlining
    the tokenizer here is quadratic."""
    if toks is None:
        toks = F.filter(F.split(F.lower(F.col("text")), " "), lambda t: t != "")
    n = F.size(toks)
    return F.when(
        n >= n_words,
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(1), n - n_words + 1),
                lambda i: F.concat_ws(" ", F.slice(toks, i, n_words)),
            )
        ),
    ).otherwise(F.array(F.concat_ws(" ", toks)))


def shingles_exploded(docs: DataFrame, n_words: int = SHINGLE_WORDS, keep: tuple = ("doc_id",)) -> DataFrame:
    """``keep``-cols → exploded distinct word-``n_words``-gram shingles,
    with the token array materialized in its OWN projection first.

    Why two projections instead of one expression: the shingle transform
    references the token array once per sequence element (inside the
    higher-order lambda) plus twice for sizing. Expression trees inside
    HOF lambdas get re-evaluated per element — inlined, the split+filter
    tokenizer runs O(tokens) times per document, making shingling
    O(tokens²). Materializing ``_toks`` behind a projection boundary makes
    every use an attribute reference; Catalyst's CollapseProject keeps the
    boundary because the expression is non-cheap and multiply-referenced.
    Measured at sf0.1: 3.3s → 0.8s for the bare explode (4.3×), which
    compounds through every shingle consumer (MinHash, Jaccard verify,
    cluster resolution, decontamination, boilerplate)."""
    toks = F.filter(F.split(F.lower(F.col("text")), " "), lambda t: t != "")
    staged = docs.select(*keep, toks.alias("_toks"))
    return staged.select(
        *keep,
        F.explode(_shingle_array(n_words, toks=F.col("_toks"))).alias("shingle"),
    )


def _shingles_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """doc_id → exploded distinct word-3-gram shingles (inverted-index
    form, used by the exact-Jaccard verify stage)."""
    docs = load_table(spark, sf_dir, "documents")
    return shingles_exploded(docs)


_SQL_TOKS = "list_filter(string_split(lower(text), ' '), t -> t <> '')"


def _sql_shingle_list(n_words: int = SHINGLE_WORDS) -> str:
    return f"""(
    CASE WHEN len({_SQL_TOKS}) >= {n_words}
         THEN list_distinct(list_transform(
                generate_series(1, len({_SQL_TOKS}) - {n_words} + 1),
                i -> array_to_string(list_slice({_SQL_TOKS}, i, i + {n_words} - 1), ' ')))
         ELSE [array_to_string({_SQL_TOKS}, ' ')] END)"""


def _sql_shingles(n_words: int = SHINGLE_WORDS) -> str:
    return f"""
  SELECT doc_id, unnest({_sql_shingle_list(n_words)}) AS shingle
  FROM documents
"""


_SQL_SHINGLE_LIST = _sql_shingle_list()
_SQL_SHINGLES = _sql_shingles()


# ---------------------------------------------------------------------------
# MinHash + LSH banding
# ---------------------------------------------------------------------------

# One strong hash per shingle + N cheap affine universal hashes
# h_i(x) = (a_i·x + b_i) mod P — the standard MinHash construction. 16×
# cheaper than hashing every shingle N times, and portable: the base hash is
# the first 15 hex digits of md5 (exact in int64), and affine/mod integer
# arithmetic is identical in every engine.
P_MOD = 1_000_000_007


def _affine_params() -> list[tuple[int, int]]:
    import hashlib

    out = []
    for i in range(N_MINHASH):
        a = int(hashlib.md5(f"minhash_a_{i}".encode()).hexdigest()[:12], 16) % (P_MOD - 1) + 1
        b = int(hashlib.md5(f"minhash_b_{i}".encode()).hexdigest()[:12], 16) % P_MOD
        out.append((a, b))
    return out


def _sql_hex_to_int(expr: str, start: int, n: int) -> str:
    """Portable hex→int (DuckDB lacks a hex-parse cast): positional digit
    arithmetic over ``n`` hex chars."""
    terms = [
        f"(strpos('0123456789abcdef', substr({expr}, {start + i}, 1)) - 1) * {16 ** (n - 1 - i)}"
        for i in range(n)
    ]
    return "(" + " + ".join(terms) + ")"


def _bands_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """doc_id → (band_idx, bucket) LSH band rows: shingle explode → one
    hash-agg to 16 affine minhashes → 4 band buckets per doc. Shared by
    the pair query, the cluster stage, and the incremental index probe."""
    sh = _shingles_df(spark, sf_dir)
    x = F.conv(F.substring(F.md5("shingle"), 1, 15), 16, 10).cast("bigint") % F.lit(P_MOD)
    hashed = sh.select("doc_id", x.alias("x"))
    minhashes = hashed.groupBy("doc_id").agg(
        *[
            F.min((F.lit(a) * F.col("x") + F.lit(b)) % F.lit(P_MOD)).alias(f"mh{i}")
            for i, (a, b) in enumerate(_affine_params())
        ]
    )
    return minhashes.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band_idx"),
                        F.md5(
                            F.concat_ws(
                                "_",
                                *[
                                    F.col(f"mh{b * ROWS_PER_BAND + r}").cast("string")
                                    for r in range(ROWS_PER_BAND)
                                ],
                            )
                        ).alias("bucket"),
                    )
                    for b in range(N_BANDS)
                ]
            )
        ).alias("band"),
    ).select("doc_id", "band.band_idx", "band.bucket")


def q_dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-LSH candidate pairs: 16 affine minhashes over one md5 base
    hash per shingle, banded 4×4; docs sharing ≥1 band bucket are
    candidates.

    Plan shape at scale: shingle explode (narrow) → one hash-agg to 16
    minhashes → band explode (4 rows/doc) → self-equi-join on (band,
    bucket); only digests ever shuffle.

    Note (measured, sf0.1): two "no-shuffle" array-domain variants both
    lose to this plan by ~2×. (a) 16 ``array_min∘transform`` signature
    columns: Catalyst's CollapseProject inlines the shingle-array
    expression into every column, recomputing shingling 16×. (b) one
    single ``F.aggregate`` fold whose merge does an element-wise
    ``zip_with`` over a 16-slot accumulator (shingling evaluated once,
    zero Exchange): 7.3s vs 3.7s — higher-order functions evaluate
    interpreted, allocating a fresh 16-element array per shingle, and
    lose to Tungsten's codegen'd hash agg even though that agg shuffles.
    The explode + groupBy below evaluates shingles exactly once (the
    aggregation is a real pipeline barrier) and wins despite its small
    shuffle."""
    bands = _bands_df(spark, sf_dir)
    a = bands.select(F.col("doc_id").alias("doc_a"), "band_idx", "bucket")
    b = bands.select(F.col("doc_id").alias("doc_b"), "band_idx", "bucket")
    return (
        a.join(b, ["band_idx", "bucket"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("n_shared_bands"))
    )


def _sql_lsh_cte_block() -> str:
    """The shingles→hashed→minhashes→bands CTE chain, shared by the LSH
    candidate query and the duplicate-clusters oracle."""
    mh_cols = ",\n         ".join(
        f"CAST(MIN(({a} * x + {b}) % {P_MOD}) AS BIGINT) AS mh{i}"
        for i, (a, b) in enumerate(_affine_params())
    )
    band_rows = " UNION ALL ".join(
        "SELECT doc_id, {b} AS band_idx, md5({concat}) AS bucket FROM minhashes".format(
            b=b,
            concat=" || '_' || ".join(
                f"CAST(mh{b * ROWS_PER_BAND + r} AS VARCHAR)" for r in range(ROWS_PER_BAND)
            ),
        )
        for b in range(N_BANDS)
    )
    return f"""shingles AS ({_SQL_SHINGLES}),
hashed AS (
  SELECT doc_id, {_sql_hex_to_int("md5(shingle)", 1, 15)} % {P_MOD} AS x FROM shingles
),
minhashes AS (
  SELECT doc_id,
         {mh_cols}
  FROM hashed
  GROUP BY doc_id
),
bands AS ({band_rows})"""


def _sql_minhash_lsh() -> str:
    return f"""
WITH {_sql_lsh_cte_block()}
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_shared_bands
FROM bands a JOIN bands b USING (band_idx, bucket)
WHERE a.doc_id < b.doc_id
GROUP BY 1, 2
"""


# ---------------------------------------------------------------------------
# Fellegi–Sunter probabilistic record-linkage decisions
# ---------------------------------------------------------------------------

# Declared comparison model: P(field agrees | match) and | non-match).
# Folded constants — each pair's weight is a product of per-field
# likelihood ratios chosen from these literals (the log-odds formulation
# is equivalent but ln is banned by the portability policy; the PRODUCT
# form is exact IEEE on identical literals).
FS_FIELDS = [
    ("lang", 0.95, 0.2),
    ("source", 0.9, 0.3),
    ("size_band", 0.8, 0.25),
]
FS_T_UPPER = 10.0   # weight ≥ upper  → link
FS_T_LOWER = 0.5    # weight ≤ lower  → non-link; between → clerical review
FS_SIZE_BAND = 64


def q_fs_record_linkage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fellegi–Sunter probabilistic record linkage (the 1969 decision
    theory every MDM/linkage system implements): candidate pairs from the
    sorted-neighborhood blocker are scored by the PRODUCT of per-field
    likelihood ratios — m/u if the field agrees, (1−m)/(1−u) if not —
    and routed link / clerical-review / non-link by the two-threshold
    rule. Completes the linkage stack: blocking
    (``dedup_sorted_neighborhood``), field comparison, DECISION (the
    edit-distance and Jaccard entries score similarity; FS turns scores
    into actions with declared error trade-offs).

    Determinism: each factor is one of two folded literals selected by
    an exact equality; the 3-factor product and threshold compares are
    fixed-shape IEEE; outputs are counts plus a decimal-quantized mean
    weight per decision. Scale shape: the SNM rank pairing (O(n·w)
    candidates), a 3-CASE expression per pair, one 3-group agg.
    """
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.substring(F.lower(F.col("text")), 1, SNM_KEY_LEN).alias("k"),
        "lang",
        "source",
        F.expr(f"n_chars DIV {FS_SIZE_BAND}").alias("size_band"),
    )
    # SNM rank via the shared bucketed decomposition (r14 optimization —
    # no single-task global sort). Bucket id = the first two characters'
    # codepoints (capped at 255): UTF-8 string comparison is codepoint
    # order, so the id is monotone non-decreasing in k — a coarsening of
    # the (k, doc_id) total order with ≤65536 bucket ids. Local import:
    # statistics imports this module at module level (cycle otherwise).
    from us_flight_bigdata_dashboard_spark.operators.statistics import _cum_prev

    kb = (
        F.least(F.coalesce(F.ascii(F.substring("k", 1, 1)), F.lit(0)), F.lit(255))
        * 256
        + F.least(F.coalesce(F.ascii(F.substring("k", 2, 1)), F.lit(0)), F.lit(255))
    )
    ranked = _cum_prev(docs, ["k", "doc_id"], {"_rp": F.lit(1)}, bucket=kb).select(
        "doc_id", "lang", "source", "size_band", (F.col("_rp") + F.lit(1)).alias("rn")
    )
    a = ranked.select(
        F.col("doc_id").alias("doc_a"),
        F.col("lang").alias("lang_a"),
        F.col("source").alias("source_a"),
        F.col("size_band").alias("band_a"),
        "rn",
        F.explode(F.sequence(F.lit(1), F.lit(SNM_WINDOW))).alias("off"),
    ).select(
        "doc_a", "lang_a", "source_a", "band_a",
        (F.col("rn") + F.col("off")).alias("rn_b"),
    )
    b = ranked.select(
        F.col("doc_id").alias("doc_b"),
        F.col("lang").alias("lang_b"),
        F.col("source").alias("source_b"),
        F.col("size_band").alias("band_b"),
        F.col("rn").alias("rn_b"),
    )
    pairs = a.join(b, "rn_b")
    w = F.lit(1.0)
    for (field, m, u), (ca, cb) in zip(
        FS_FIELDS, [("lang_a", "lang_b"), ("source_a", "source_b"), ("band_a", "band_b")]
    ):
        w = w * F.when(F.col(ca) == F.col(cb), F.lit(m / u)).otherwise(
            F.lit((1.0 - m) / (1.0 - u))
        )
    decision = (
        F.when(F.col("w") >= FS_T_UPPER, F.lit("link"))
        .when(F.col("w") <= FS_T_LOWER, F.lit("non_link"))
        .otherwise(F.lit("clerical_review"))
    )
    from us_flight_bigdata_dashboard_spark.functions.exact import dsum as _dsum

    return (
        pairs.select(w.alias("w"))
        .select("w", decision.alias("decision"))
        .groupBy("decision")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_pairs"),
            (_dsum("w", scale=8) / F.count(F.lit(1))).alias("mean_weight"),
        )
        .orderBy("decision")
    )


def _sql_fs_linkage() -> str:
    factors = []
    for (field, m, u), (ca, cb) in zip(
        FS_FIELDS, [("lang_a", "lang_b"), ("source_a", "source_b"), ("band_a", "band_b")]
    ):
        factors.append(
            f"(CASE WHEN {ca} = {cb} THEN CAST('{m / u!r}' AS DOUBLE)"
            f" ELSE CAST('{(1.0 - m) / (1.0 - u)!r}' AS DOUBLE) END)"
        )
    w_expr = "1.0 * " + " * ".join(factors)
    return f"""
WITH ranked AS (
  SELECT doc_id, lang, source, n_chars // {FS_SIZE_BAND} AS size_band,
         ROW_NUMBER() OVER (ORDER BY SUBSTRING(LOWER(text), 1, {SNM_KEY_LEN}),
                            doc_id) AS rn
  FROM documents
), a AS (
  SELECT doc_id AS doc_a, lang AS lang_a, source AS source_a,
         size_band AS band_a, rn + off.k AS rn_b
  FROM ranked, (SELECT unnest(generate_series(1, {SNM_WINDOW})) AS k) off
), b AS (
  SELECT doc_id AS doc_b, lang AS lang_b, source AS source_b,
         size_band AS band_b, rn
  FROM ranked
), pairs AS (
  SELECT {w_expr} AS w
  FROM a JOIN b ON a.rn_b = b.rn
), scored AS (
  SELECT w,
         CASE WHEN w >= {FS_T_UPPER!r} THEN 'link'
              WHEN w <= {FS_T_LOWER!r} THEN 'non_link'
              ELSE 'clerical_review' END AS decision
  FROM pairs
)
SELECT decision, CAST(COUNT(*) AS BIGINT) AS n_pairs,
       ({sql_dsum("w", scale=8)} / COUNT(*)) AS mean_weight
FROM scored
GROUP BY 1
ORDER BY decision
"""




# ---------------------------------------------------------------------------
# MinHash estimator evaluation (estimated vs exact Jaccard on candidates)
# ---------------------------------------------------------------------------

MINHASH_EVAL_TAU = 0.5


def q_dedup_minhash_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch-quality evaluation of the MinHash estimator itself: for
    every LSH candidate pair, the 16-hash Jaccard ESTIMATE (matching
    minhash fraction) against the EXACT shingle Jaccard, summarized as a
    confusion matrix at τ={tau} plus the mean absolute estimation error —
    the ``ann_recall_eval`` of the dedup family (an estimator you haven't
    measured is a rumor; this makes the 16-hash accuracy a gated number).
    Scope is the candidate set by construction — LSH-missed pairs are a
    RECALL question (``dedup_threshold_sweep``), not an estimator one.

    Determinism: the estimate is an exact rational (match count / 16),
    exact Jaccard is exact integers, threshold compares are on exact
    values, and MAE uses the decimal-quantized sum. Scale shape: the
    estimate join touches only the |candidates| × 16-column signature
    frame; the exact-Jaccard stage explodes shingles ONLY for docs that
    appear in a candidate pair (semi-join pushdown) — eval-sized, never
    corpus-quadratic.
    """
    sh = _shingles_df(spark, sf_dir)
    x = F.conv(F.substring(F.md5("shingle"), 1, 15), 16, 10).cast("bigint") % F.lit(
        P_MOD
    )
    hashed = sh.select("doc_id", "shingle", x.alias("x"))
    minhashes = hashed.groupBy("doc_id").agg(
        *[
            F.min((F.lit(a) * F.col("x") + F.lit(b)) % F.lit(P_MOD)).alias(f"mh{i}")
            for i, (a, b) in enumerate(_affine_params())
        ]
    ).localCheckpoint(eager=True)
    cand = q_dedup_minhash_lsh(spark, sf_dir).select("doc_a", "doc_b")
    mh_a = minhashes.select(
        F.col("doc_id").alias("doc_a"),
        *[F.col(f"mh{i}").alias(f"a{i}") for i in range(N_MINHASH)],
    )
    mh_b = minhashes.select(
        F.col("doc_id").alias("doc_b"),
        *[F.col(f"mh{i}").alias(f"b{i}") for i in range(N_MINHASH)],
    )
    match_cnt = sum(
        (F.col(f"a{i}") == F.col(f"b{i}")).cast("int") for i in range(N_MINHASH)
    )
    est = cand.join(mh_a, "doc_a").join(mh_b, "doc_b").select(
        "doc_a",
        "doc_b",
        (match_cnt.cast("double") / F.lit(float(N_MINHASH))).alias("est_j"),
    )
    cand_docs = (
        cand.select(F.col("doc_a").alias("doc_id"))
        .unionAll(cand.select(F.col("doc_b").alias("doc_id")))
        .distinct()
    )
    sh_c = sh.join(cand_docs, "doc_id", "left_semi").localCheckpoint(eager=True)
    sizes = sh_c.groupBy("doc_id").agg(F.count(F.lit(1)).cast("long").alias("n_sh"))
    a_side = sh_c.select(F.col("doc_id").alias("doc_a"), "shingle")
    b_side = sh_c.select(F.col("doc_id").alias("doc_b"), "shingle")
    common = (
        a_side.join(b_side, "shingle")
        .join(cand, ["doc_a", "doc_b"], "left_semi")
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).cast("long").alias("n_common"))
    )
    exact = (
        cand.join(common, ["doc_a", "doc_b"], "left")
        .join(sizes.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("n_sh", "n_a"), "doc_a")
        .join(sizes.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("n_sh", "n_b"), "doc_b")
        .select(
            "doc_a",
            "doc_b",
            (
                F.coalesce("n_common", F.lit(0)).cast("double")
                / (
                    F.col("n_a") + F.col("n_b") - F.coalesce("n_common", F.lit(0))
                ).cast("double")
            ).alias("exact_j"),
        )
    )
    scored = est.join(exact, ["doc_a", "doc_b"])
    tau = F.lit(MINHASH_EVAL_TAU)
    return scored.agg(
        F.count(F.lit(1)).cast("long").alias("n_candidates"),
        F.sum(((F.col("est_j") >= tau) & (F.col("exact_j") >= tau)).cast("long"))
        .cast("long")
        .alias("tp"),
        F.sum(((F.col("est_j") >= tau) & (F.col("exact_j") < tau)).cast("long"))
        .cast("long")
        .alias("fp"),
        F.sum(((F.col("est_j") < tau) & (F.col("exact_j") >= tau)).cast("long"))
        .cast("long")
        .alias("fn"),
        F.sum(((F.col("est_j") < tau) & (F.col("exact_j") < tau)).cast("long"))
        .cast("long")
        .alias("tn"),
        (
            dsum(F.abs(F.col("est_j") - F.col("exact_j")), scale=6)
            / F.count(F.lit(1))
        ).alias("mae"),
    )
q_dedup_minhash_eval.__doc__ = q_dedup_minhash_eval.__doc__ and q_dedup_minhash_eval.__doc__.format(tau=MINHASH_EVAL_TAU)


def _sql_minhash_eval() -> str:
    match_terms = " + ".join(
        f"CASE WHEN a.mh{i} = b.mh{i} THEN 1 ELSE 0 END" for i in range(N_MINHASH)
    )
    return f"""
WITH {_sql_lsh_cte_block()},
cand AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM bands a JOIN bands b USING (band_idx, bucket)
  WHERE a.doc_id < b.doc_id
  GROUP BY 1, 2
),
est AS (
  SELECT c.doc_a, c.doc_b,
         CAST(({match_terms}) AS DOUBLE) / {float(N_MINHASH)} AS est_j
  FROM cand c
  JOIN minhashes a ON c.doc_a = a.doc_id
  JOIN minhashes b ON c.doc_b = b.doc_id
),
sizes AS (
  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_sh FROM shingles GROUP BY 1
),
common AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, CAST(COUNT(*) AS BIGINT) AS n_common
  FROM shingles a
  JOIN shingles b ON a.shingle = b.shingle
  JOIN cand c2 ON a.doc_id = c2.doc_a AND b.doc_id = c2.doc_b
  GROUP BY 1, 2
),
scored AS (
  SELECT c.doc_a, c.doc_b, e.est_j,
         CAST(COALESCE(m.n_common, 0) AS DOUBLE)
           / CAST(sa.n_sh + sb.n_sh - COALESCE(m.n_common, 0) AS DOUBLE) AS exact_j
  FROM cand c
  JOIN est e ON c.doc_a = e.doc_a AND c.doc_b = e.doc_b
  LEFT JOIN common m ON c.doc_a = m.doc_a AND c.doc_b = m.doc_b
  JOIN sizes sa ON c.doc_a = sa.doc_id
  JOIN sizes sb ON c.doc_b = sb.doc_id
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_candidates,
       CAST(SUM(CASE WHEN est_j >= {MINHASH_EVAL_TAU} AND exact_j >= {MINHASH_EVAL_TAU} THEN 1 ELSE 0 END) AS BIGINT) AS tp,
       CAST(SUM(CASE WHEN est_j >= {MINHASH_EVAL_TAU} AND exact_j < {MINHASH_EVAL_TAU} THEN 1 ELSE 0 END) AS BIGINT) AS fp,
       CAST(SUM(CASE WHEN est_j < {MINHASH_EVAL_TAU} AND exact_j >= {MINHASH_EVAL_TAU} THEN 1 ELSE 0 END) AS BIGINT) AS fn,
       CAST(SUM(CASE WHEN est_j < {MINHASH_EVAL_TAU} AND exact_j < {MINHASH_EVAL_TAU} THEN 1 ELSE 0 END) AS BIGINT) AS tn,
       ({sql_dsum("ABS(est_j - exact_j)", scale=6)} / COUNT(*)) AS mae
FROM scored
"""




# ---------------------------------------------------------------------------
# Duplicate clusters: LSH pairs → connected components → keeper per cluster
# ---------------------------------------------------------------------------

MAX_CC_ITERS = 20


def q_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The production stage after LSH: candidate *pairs* → duplicate
    *clusters* (connected components) → one keeper per cluster, so
    transitive duplicates (A~B, B~C but never A⋈C as a pair) still
    collapse to a single kept document.

    Iterative min-label propagation: every doc starts labeled with its own
    id; each round it takes the min of its label and its neighbors' labels;
    the component's minimum id floods outward one hop per round, so the
    loop converges in O(component diameter) rounds — duplicate clusters
    are near-cliques (diameter 1-2), and the testdata fixed point lands in
    2-3 rounds. ``localCheckpoint`` truncates the growing lineage each
    round (iterative-plan hygiene); convergence is detected by the label
    sum reaching a fixed point (labels only ever decrease, so an unchanged
    sum means an unchanged labeling). Per round the plan is one equi-join
    plus one min-aggregate on the candidate-pair graph — pairs are ≪ n²
    by LSH design, so at 100 TB each round shuffles only the pair list.
    (The large-star/small-star variant of the same fixed point — Kiveris
    et al., "Connected Components in MapReduce" — is the drop-in upgrade
    if components with large diameters ever appear.)

    Output: doc_id, cluster_id (= min doc id in the component), is_keeper
    (true for the one kept doc per cluster). Docs in no candidate pair are
    implicit singletons and are not repeated here.
    """
    pairs = q_dedup_minhash_lsh(spark, sf_dir).select("doc_a", "doc_b")
    # localCheckpoint, not persist: the LSH chain runs ONCE into block
    # storage and the lineage truncates, so every iteration plans against
    # a size-known materialized edge list (A/B at sf0.1: 2.5-2.9s vs
    # 3.2-3.8s with persist, and no unpersist bookkeeping)
    edges = (
        pairs.select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst"))
        .union(pairs.select(F.col("doc_b").alias("src"), F.col("doc_a").alias("dst")))
        .localCheckpoint(eager=True)
    )
    labels = (
        edges.select(F.col("src").alias("doc_id"))
        .distinct()
        .select("doc_id", F.col("doc_id").alias("cluster_id"))
    )
    prev_sum = object()
    for _ in range(MAX_CC_ITERS):
        nbr = (
            edges.join(labels, edges["dst"] == labels["doc_id"])
            .groupBy("src")
            .agg(F.min("cluster_id").alias("nbr_min"))
        )
        labels = (
            labels.join(nbr, labels["doc_id"] == nbr["src"], "left")
            .select(
                "doc_id",
                F.least(
                    F.col("cluster_id"), F.coalesce(F.col("nbr_min"), F.col("cluster_id"))
                ).alias("cluster_id"),
            )
            .localCheckpoint(eager=True)
        )
        label_sum = labels.agg(F.sum("cluster_id")).collect()[0][0]
        if label_sum == prev_sum:
            break
        prev_sum = label_sum
    return labels.select(
        "doc_id", "cluster_id", (F.col("doc_id") == F.col("cluster_id")).alias("is_keeper")
    )


def _sql_dedup_clusters() -> str:
    """Oracle: transitive closure of the undirected candidate-pair graph
    via a recursive CTE; component id = min reachable doc id."""
    return f"""
WITH RECURSIVE {_sql_lsh_cte_block()},
pairs AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM bands a JOIN bands b USING (band_idx, bucket)
  WHERE a.doc_id < b.doc_id
  GROUP BY 1, 2
),
edges AS (
  SELECT doc_a AS src, doc_b AS dst FROM pairs
  UNION
  SELECT doc_b AS src, doc_a AS dst FROM pairs
),
reach AS (
  SELECT src, dst FROM edges
  UNION
  SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src
)
SELECT src AS doc_id,
       LEAST(src, MIN(dst)) AS cluster_id,
       src = LEAST(src, MIN(dst)) AS is_keeper
FROM reach
GROUP BY src
"""


MAX_LS_ITERS = 12


def large_small_star(pairs: DataFrame) -> tuple[DataFrame, int]:
    """Connected components via alternating LARGE-STAR / SMALL-STAR rounds
    (Kiveris et al., "Connected Components in MapReduce and Beyond",
    SoCC'14) — the O(log diameter) upgrade over one-hop min-label
    propagation: each round rewires every node toward its neighborhood
    minimum, roughly halving path lengths, so chain-shaped components
    converge logarithmically instead of linearly.

    Per round: large-star (grouped on each node u, every larger neighbor
    v > u re-points at m = min(N(u) ∪ {u})) then small-star (grouped on
    the larger endpoint of each directed edge, every smaller neighbor and
    u itself point at the local min). Each star op is ONE hash-agg plus
    ONE equi-join on the edge list — the same per-round shuffle budget as
    label propagation, just fewer rounds. Edges localCheckpoint each
    round (lineage hygiene for iterative plans); the fixed point is
    detected by the (count, Σchild, Σparent) triple of the directed
    child→parent edge set stabilizing (at the fixed point the edge set IS
    the star forest, so the triple is stationary; intermediate rounds
    that coincidentally matched on all three sums have never been
    observed and would only cost an extra confirming round if they did —
    the loop also hard-caps at MAX_LS_ITERS).

    Input: undirected candidate pairs (doc_a, doc_b). Returns (labels,
    n_rounds): labels = (doc_id, cluster_id = component min) for every
    node appearing in a pair."""
    sym = pairs.select(F.col("doc_a").alias("u"), F.col("doc_b").alias("v")).union(
        pairs.select(F.col("doc_b").alias("u"), F.col("doc_a").alias("v"))
    )
    edges = sym.distinct().localCheckpoint(eager=True)
    prev = None
    rounds = 0
    stars = edges  # directed child→parent set, defined after round 1
    for rounds in range(1, MAX_LS_ITERS + 1):
        # large-star: v > u re-points at min(N(u) ∪ {u})
        m = (
            edges.groupBy("u")
            .agg(F.min("v").alias("mn"))
            .select("u", F.least(F.col("u"), F.col("mn")).alias("m"))
        )
        ls = (
            edges.join(m, "u")
            .filter(F.col("v") > F.col("u"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .distinct()
        )
        # small-star over big→small edges: neighbors ∪ {u} point at local min
        m2 = (
            ls.groupBy("u")
            .agg(F.min("v").alias("mn"))
            .select("u", F.least(F.col("u"), F.col("mn")).alias("m"))
        )
        children = (
            ls.join(m2, "u")
            .select(F.col("v").alias("c"), F.col("m"))
            .filter(F.col("c") != F.col("m"))
        )
        selves = m2.select(F.col("u").alias("c"), F.col("m")).filter(
            F.col("c") != F.col("m")
        )
        stars = children.union(selves).distinct().localCheckpoint(eager=True)
        sig = stars.agg(
            F.count(F.lit(1)), F.sum("c"), F.sum("m")
        ).collect()[0]
        sig = (sig[0], sig[1], sig[2])
        if sig == prev:
            break
        prev = sig
        edges = stars.select("c", "m").toDF("u", "v").union(
            stars.select(F.col("m").alias("u"), F.col("c").alias("v"))
        )
    roots = stars.select(F.col("m").alias("doc_id")).distinct().select(
        "doc_id", F.col("doc_id").alias("cluster_id")
    )
    labels = stars.select(
        F.col("c").alias("doc_id"), F.col("m").alias("cluster_id")
    ).union(roots)
    return labels, rounds


def q_dedup_clusters_ls(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``dedup_clusters`` computed by the large-star/small-star fixed point
    instead of one-hop min-label propagation — identical output contract
    (doc_id, cluster_id = component-min, is_keeper), identical recursive-
    CTE oracle, O(log diameter) rounds instead of O(diameter). Use THIS
    variant when duplicate components can be long chains (transcription
    chains, near-dup drift over crawl snapshots); the label-propagation
    twin stays optimal for the near-clique clusters LSH typically emits
    (diameter 1-2 ⇒ 2-3 cheaper rounds)."""
    pairs = q_dedup_minhash_lsh(spark, sf_dir).select("doc_a", "doc_b")
    labels, _ = large_small_star(pairs)
    return labels.select(
        "doc_id",
        "cluster_id",
        (F.col("doc_id") == F.col("cluster_id")).alias("is_keeper"),
    )


# ---------------------------------------------------------------------------
# Cross-source overlap matrix (corpus-composition diagnostic)
# ---------------------------------------------------------------------------

OVERLAP_NGRAM = 8


def q_source_overlap_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-SOURCE duplication matrix: for every source pair, how many
    distinct word-{OVERLAP_NGRAM}-grams they share, and the containment
    coefficient ``shared / min(|A|, |B|)`` — the corpus-composition
    diagnostic run before mixing crawls (C4 vs Common Crawl vs curated
    dumps overlap heavily; double-counting a source pair inflates its
    effective epoch count, and this matrix is how that is caught).

    Scale shape: the unit is the (source, shingle) DISTINCT pair — the
    self-join key is the shingle, and each shingle contributes at most
    |sources|² pairs REGARDLESS of corpus size (the doc dimension is
    collapsed by the distinct before the join), so the join output is
    bounded by |sources|² · |distinct shingles|, never by document count
    — the same reason the DF-capped Jaccard join stays sparse but by
    construction rather than by cap. Totals are a tiny per-source agg
    broadcast back for the coefficient.
    """
    docs = load_table(spark, sf_dir, "documents")
    sh = (
        shingles_exploded(docs, n_words=OVERLAP_NGRAM, keep=("source",))
        .select("source", "shingle")
        .distinct()
    )
    totals = sh.groupBy("source").agg(F.count(F.lit(1)).alias("n_shingles"))
    a = sh.select(F.col("source").alias("source_a"), "shingle")
    b = sh.select(F.col("source").alias("source_b"), "shingle")
    shared = (
        a.join(b, "shingle")
        .filter(F.col("source_a") < F.col("source_b"))
        .groupBy("source_a", "source_b")
        .agg(F.count(F.lit(1)).alias("n_shared_shingles"))
    )
    ta = totals.select(F.col("source").alias("source_a"), F.col("n_shingles").alias("_na"))
    tb = totals.select(F.col("source").alias("source_b"), F.col("n_shingles").alias("_nb"))
    return (
        shared.join(F.broadcast(ta), "source_a")
        .join(F.broadcast(tb), "source_b")
        .select(
            "source_a",
            "source_b",
            "n_shared_shingles",
            (
                F.col("n_shared_shingles").cast("double")
                / F.least(F.col("_na"), F.col("_nb"))
            ).alias("overlap_coef"),
        )
    )


def _sql_source_overlap() -> str:
    return f"""
WITH sh AS (
  SELECT DISTINCT source, shingle FROM (
    SELECT source, unnest({_sql_shingle_list(OVERLAP_NGRAM)}) AS shingle
    FROM documents
  )
), tot AS (
  SELECT source, COUNT(*) AS n FROM sh GROUP BY source
), shared AS (
  SELECT a.source AS source_a, b.source AS source_b, COUNT(*) AS n_shared_shingles
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.source < b.source
  GROUP BY 1, 2
)
SELECT s.source_a, s.source_b, s.n_shared_shingles,
       CAST(s.n_shared_shingles AS DOUBLE) / least(ta.n, tb.n) AS overlap_coef
FROM shared s
JOIN tot ta ON ta.source = s.source_a
JOIN tot tb ON tb.source = s.source_b
"""


def q_dedup_keep_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-aware keeper selection — the final curation stage of the
    dedup pipeline: within each duplicate cluster keep the BEST document
    (longest text as the quality proxy; CCNet-style pipelines keep the
    highest-quality copy, not the lowest id), deterministic ties by lowest
    doc_id via the (n_chars, -doc_id) argmax struct.

    Plan shape: cluster membership (LSH → connected components) joins the
    documents metadata on doc_id — at scale a shuffle of (doc_id,
    cluster_id) pairs only, never text — and one hash-agg per cluster.
    ``max_by`` over a struct is the lexicographic argmax in both engines
    (DuckDB: ``arg_max`` over a list key)."""
    clusters = q_dedup_clusters(spark, sf_dir).select("doc_id", "cluster_id")
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "n_chars")
    return (
        clusters.join(docs, "doc_id")
        .groupBy("cluster_id")
        .agg(
            F.max_by(
                "doc_id", F.struct(F.col("n_chars"), (-F.col("doc_id")).alias("neg"))
            ).alias("keep_doc_id"),
            F.count(F.lit(1)).alias("n_docs"),
            F.max("n_chars").alias("keep_n_chars"),
        )
    )


def _sql_dedup_keep_best() -> str:
    return f"""
WITH RECURSIVE {_sql_lsh_cte_block()},
pairs AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM bands a JOIN bands b USING (band_idx, bucket)
  WHERE a.doc_id < b.doc_id
  GROUP BY 1, 2
),
edges AS (
  SELECT doc_a AS src, doc_b AS dst FROM pairs
  UNION
  SELECT doc_b AS src, doc_a AS dst FROM pairs
),
reach AS (
  SELECT src, dst FROM edges
  UNION
  SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src
),
clusters AS (
  SELECT src AS doc_id, LEAST(src, MIN(dst)) AS cluster_id FROM reach GROUP BY src
),
ranked AS (
  SELECT c.cluster_id, c.doc_id, d.n_chars,
         ROW_NUMBER() OVER (PARTITION BY c.cluster_id
                            ORDER BY d.n_chars DESC, c.doc_id ASC) AS rn,
         COUNT(*) OVER (PARTITION BY c.cluster_id) AS n_docs,
         MAX(d.n_chars) OVER (PARTITION BY c.cluster_id) AS keep_n_chars
  FROM clusters c JOIN documents d USING (doc_id)
)
SELECT cluster_id, doc_id AS keep_doc_id, n_docs, keep_n_chars
FROM ranked WHERE rn = 1
"""


# ---------------------------------------------------------------------------
# Exact n-gram Jaccard (top-k most similar pairs)
# ---------------------------------------------------------------------------

MAX_SHINGLE_DF = 50


def q_dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact shingle-set Jaccard via inverted-index self-join; top-20 pairs
    under a deterministic total order. This is the verify stage an LSH pass
    feeds at scale (candidates only).

    Hot-shingle guard: shingles with document frequency > MAX_SHINGLE_DF
    (stop-phrases) are dropped before the self-join — the standard
    CCNet/Gopher trick. Without it the self-join is quadratic in the
    posting list of any high-DF shingle; with it candidate pairs are
    bounded by n_docs · MAX_SHINGLE_DF per shingle. Jaccard is computed
    over the capped shingle sets (sizes counted after the cap) so the
    similarity definition is self-consistent; a stop-phrase shared by
    thousands of docs correctly contributes no signal.

    Plan shape: document frequency comes from a count window over the
    shingle partitioning (no groupBy+join round trip), and the capped
    inverted index is materialized once (eager localCheckpoint) — it feeds
    three consumers (both self-join sides and the per-doc sizes), and
    without the materialization Catalyst would
    re-run the explode+window chain for each (measured 3-4× the runtime at
    sf0.1). The cache also carries the shingle hash-partitioning into the
    self-join, so the join reuses it instead of re-shuffling."""
    sh = _shingles_df(spark, sf_dir)
    from pyspark.sql import Window

    df_w = Window.partitionBy("shingle")
    kept = (
        sh.withColumn("df", F.count(F.lit(1)).over(df_w))
        .filter(F.col("df") <= MAX_SHINGLE_DF)
        .drop("df")
        .localCheckpoint(eager=True)
    )
    sizes = kept.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    a = kept.select(F.col("doc_id").alias("doc_a"), "shingle")
    b = kept.select(F.col("doc_id").alias("doc_b"), "shingle")
    common = (
        a.join(b, "shingle")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("n_a"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("n_b"))
    # no broadcast hint: sizes has one row per document (unbounded at
    # scale) — let Catalyst/AQE pick broadcast vs shuffle by actual size
    jac = (
        common.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            "n_common",
            (
                F.col("n_common").cast("double")
                / (F.col("n_a") + F.col("n_b") - F.col("n_common"))
            ).alias("jaccard"),
        )
    )
    return jac.orderBy(F.col("jaccard").desc(), F.col("doc_a").asc(), F.col("doc_b").asc()).limit(20)


def _sql_ngram_jaccard() -> str:
    return f"""
WITH shingles AS ({_SQL_SHINGLES}),
rare AS (SELECT shingle FROM shingles GROUP BY shingle HAVING COUNT(*) <= {MAX_SHINGLE_DF}),
kept AS (SELECT s.doc_id, s.shingle FROM shingles s JOIN rare USING (shingle)),
sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM kept GROUP BY 1),
common AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_common
  FROM kept a JOIN kept b USING (shingle)
  WHERE a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT doc_a, doc_b, n_common,
       CAST(n_common AS DOUBLE) / (sa.n_sh + sb.n_sh - n_common) AS jaccard
FROM common
JOIN sizes sa ON sa.doc_id = doc_a
JOIN sizes sb ON sb.doc_id = doc_b
ORDER BY jaccard DESC, doc_a ASC, doc_b ASC
LIMIT 20
"""


# ---------------------------------------------------------------------------
# SimHash signatures
# ---------------------------------------------------------------------------

def q_dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """16-bit SimHash per document: each md5 hex digit of every token votes
    ±1 on one signature bit (digit ≥ '8' → +1); bit = sign of the vote sum.
    Near-duplicates land at small Hamming distance — signatures are the
    groupable/bucketable unit at scale."""
    docs = load_table(spark, sf_dir, "documents")
    toks = F.filter(F.split(F.lower(F.col("text")), " "), lambda t: t != "")
    tok = docs.select("doc_id", F.explode(toks).alias("token")).withColumn("h", F.md5("token"))
    votes = tok.groupBy("doc_id").agg(
        *[
            F.sum(
                F.when(F.substring("h", j + 1, 1) >= "8", 1).otherwise(-1)
            ).alias(f"v{j}")
            for j in range(16)
        ]
    )
    bits = [F.when(F.col(f"v{j}") >= 0, F.lit("1")).otherwise(F.lit("0")) for j in range(16)]
    return votes.select("doc_id", F.concat(*bits).alias("simhash16"))


def _sql_simhash() -> str:
    votes = ",\n         ".join(
        f"CAST(SUM(CASE WHEN substr(h, {j + 1}, 1) >= '8' THEN 1 ELSE -1 END) AS BIGINT) AS v{j}"
        for j in range(16)
    )
    bits = " || ".join(f"(CASE WHEN v{j} >= 0 THEN '1' ELSE '0' END)" for j in range(16))
    return f"""
WITH tok AS (
  SELECT doc_id, md5(unnest({_SQL_TOKS})) AS h FROM documents
),
votes AS (
  SELECT doc_id,
         {votes}
  FROM tok
  GROUP BY doc_id
)
SELECT doc_id, {bits} AS simhash16 FROM votes
"""


def q_dedup_edit_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Character-level verify stage: exact Levenshtein distance over the
    LSH candidate pairs (the complement of the token-level Jaccard verify
    — edit distance catches near-dups whose differences are *within*
    tokens, e.g. OCR noise and typo clones, which shingle overlap
    under-scores).

    Runs only on LSH candidates, never all pairs — at 100 TB the
    quadratic-cost exact distance touches O(candidates) ≪ O(n²) rows, and
    the two text lookups are key joins against the (much smaller) pair
    list, so each document's text ships at most once per pair side. The
    similarity normalization 1 − lev/max(len) is a single double division
    (bit-stable)."""
    pairs = q_dedup_minhash_lsh(spark, sf_dir).select("doc_a", "doc_b")
    docs = load_table(spark, sf_dir, "documents")
    ta = docs.select(F.col("doc_id").alias("doc_a"), F.col("text").alias("text_a"))
    tb = docs.select(F.col("doc_id").alias("doc_b"), F.col("text").alias("text_b"))
    lev = F.levenshtein("text_a", "text_b")
    return (
        pairs.join(ta, "doc_a")
        .join(tb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            lev.alias("edit_distance"),
            (
                F.lit(1.0)
                - lev.cast("double")
                / F.greatest(F.length("text_a"), F.length("text_b")).cast("double")
            ).alias("edit_similarity"),
        )
    )


def _sql_edit_distance() -> str:
    return f"""
WITH {_sql_lsh_cte_block()},
pairs AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM bands a JOIN bands b USING (band_idx, bucket)
  WHERE a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT p.doc_a, p.doc_b,
       CAST(levenshtein(da.text, db.text) AS INTEGER) AS edit_distance,
       1.0 - CAST(levenshtein(da.text, db.text) AS DOUBLE)
           / CAST(greatest(length(da.text), length(db.text)) AS DOUBLE) AS edit_similarity
FROM pairs p
JOIN documents da ON da.doc_id = p.doc_a
JOIN documents db ON db.doc_id = p.doc_b
"""



# ---------------------------------------------------------------------------
# Incremental dedup: new crawl batch vs existing index
# ---------------------------------------------------------------------------

INCR_INDEX_PCT = 90  # hash buckets [0,90) = indexed corpus, [90,100) = new batch


def q_dedup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental (continuous-crawl) deduplication: probe a NEW batch of
    documents against the minhash-band index of the EXISTING corpus and
    decide keep/drop per new doc — the production shape of dedup at
    100 TB, where re-running all-pairs LSH over corpus+batch every crawl
    is a non-starter; the corpus's band table is the persisted index and
    each crawl joins only its batch against it.

    The corpus/batch split is the deterministic md5 bucket (same
    construction as the sampling family): buckets [0,{INCR_INDEX_PCT}) are
    "already indexed", the rest arrive as the new batch. Per new doc the
    best match is the indexed doc sharing the most bands (ties → smallest
    doc id, total order for the oracle).

    Scale shape: band computation for the batch only (the index's bands
    are, in production, already materialized — here both derive from one
    `_bands_df` call and Catalyst splits the scan); the probe is an
    equi-join on (band_idx, bucket) whose left side is BATCH-sized, then
    one window + one agg over candidate matches. Nothing corpus×corpus.
    """
    bands = _bands_df(spark, sf_dir).withColumn(
        "_hb",
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 15), 16, 10).cast(
            "bigint"
        )
        % 100,
    )
    index = bands.filter(F.col("_hb") < INCR_INDEX_PCT).select(
        F.col("doc_id").alias("index_doc"), "band_idx", "bucket"
    )
    batch = bands.filter(F.col("_hb") >= INCR_INDEX_PCT).select(
        "doc_id", "band_idx", "bucket"
    )
    matches = (
        batch.join(index, ["band_idx", "bucket"])
        .groupBy("doc_id", "index_doc")
        .agg(F.count(F.lit(1)).alias("n_shared_bands"))
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.desc("n_shared_bands"), F.asc("index_doc")
    )
    best = (
        matches.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") == 1)
        .select("doc_id", "index_doc", "n_shared_bands")
    )
    new_docs = batch.select("doc_id").distinct()
    return new_docs.join(best, "doc_id", "left").select(
        "doc_id",
        F.col("index_doc").isNotNull().alias("is_duplicate"),
        F.col("index_doc").alias("best_match"),
        F.coalesce("n_shared_bands", F.lit(0)).alias("n_shared_bands"),
    )


def _sql_dedup_incremental() -> str:
    hb = _sql_hex_to_int("md5(CAST(doc_id AS VARCHAR))", 1, 15)
    return f"""
WITH {_sql_lsh_cte_block()},
hbands AS (SELECT doc_id, band_idx, bucket, {hb} % 100 AS _hb FROM bands),
index_b AS (SELECT doc_id AS index_doc, band_idx, bucket FROM hbands WHERE _hb < {INCR_INDEX_PCT}),
batch_b AS (SELECT doc_id, band_idx, bucket FROM hbands WHERE _hb >= {INCR_INDEX_PCT}),
matches AS (
  SELECT b.doc_id, i.index_doc, COUNT(*) AS n_shared_bands
  FROM batch_b b JOIN index_b i USING (band_idx, bucket)
  GROUP BY 1, 2
),
best AS (
  SELECT doc_id, index_doc, n_shared_bands
  FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
                                     ORDER BY n_shared_bands DESC, index_doc ASC) AS _rk
        FROM matches)
  WHERE _rk = 1
)
SELECT n.doc_id,
       (b.index_doc IS NOT NULL) AS is_duplicate,
       b.index_doc AS best_match,
       COALESCE(b.n_shared_bands, 0) AS n_shared_bands
FROM (SELECT DISTINCT doc_id FROM batch_b) n
LEFT JOIN best b USING (doc_id)
"""


# ---------------------------------------------------------------------------
# Sub-document chunk-level dedup (paragraph dedup for flat text)
# ---------------------------------------------------------------------------

CHUNK_TOKENS = 20
CHUNK_TOP_DOCS = 50


def q_dedup_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sub-document deduplication at fixed {CHUNK_TOKENS}-token chunk
    granularity: every repeated chunk instance except its canonical first
    occurrence (min (doc_id, chunk_idx)) is marked duplicate, and each doc
    reports how much of it survives chunk-level dedup — the
    paragraph-dedup stage of pretraining pipelines (the synthetic corpus
    has no newline structure, so fixed token windows stand in for
    paragraph boundaries).

    Scale shape: tokenize + chunk are narrow array exprs; one explode to
    chunk instances; canonical-occurrence marking is two window passes
    over the SAME partition key (chunk text) — one shuffle — then a
    per-doc hash-agg. Nothing is ever joined all-pairs; the chunk-hash
    shuffle is the only wide op, exactly like exact dedup.

    Output: the {CHUNK_TOP_DOCS} most-duplicated docs under a total order
    (bounded result at any corpus size).
    """
    docs = load_table(spark, sf_dir, "documents")
    # token array staged behind a projection boundary — referenced per
    # chunk inside the transform lambda (see shingles_exploded)
    staged = docs.select(
        "doc_id",
        F.filter(F.split(F.lower(F.col("text")), " "), lambda t: t != "").alias("_toks"),
    )
    toks = F.col("_toks")
    # size=0 would make the stop bound -1, and Spark's sequence(0, -1)
    # yields a DESCENDING [0, -1] rather than the empty list — guard so a
    # zero-token document produces zero chunks on both engines
    chunks = F.when(
        F.size(toks) > 0,
        F.transform(
            F.sequence(F.lit(0), F.floor((F.size(toks) - 1) / CHUNK_TOKENS).cast("int")),
            lambda i: F.concat_ws(" ", F.slice(toks, i * CHUNK_TOKENS + 1, CHUNK_TOKENS)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    inst = staged.select(
        "doc_id", F.posexplode(chunks).alias("chunk_idx", "chunk")
    )
    w = Window.partitionBy("chunk")
    marked = (
        inst.withColumn("d0", F.min("doc_id").over(w))
        .withColumn(
            "i0",
            F.min(F.when(F.col("doc_id") == F.col("d0"), F.col("chunk_idx"))).over(w),
        )
        .select(
            "doc_id",
            (
                ~((F.col("doc_id") == F.col("d0")) & (F.col("chunk_idx") == F.col("i0")))
            ).cast("int").alias("is_dup"),
        )
    )
    return (
        marked.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_chunks"),
            F.sum("is_dup").alias("n_dup_chunks"),
        )
        .withColumn(
            "retained_frac",
            (F.col("n_chunks") - F.col("n_dup_chunks"))
            / F.col("n_chunks").cast("double"),
        )
        .orderBy(F.desc("n_dup_chunks"), F.asc("doc_id"))
        .limit(CHUNK_TOP_DOCS)
    )


_ORACLE_DEDUP_CHUNKS = f"""
WITH inst AS (
  SELECT doc_id, u.chunk_idx, u.chunk FROM (
    SELECT doc_id,
           unnest(list_transform(
             generate_series(0, CAST(floor((len({_SQL_TOKS}) - 1) / {CHUNK_TOKENS}) AS INT)),
             i -> struct_pack(chunk_idx := CAST(i AS INT),
                              chunk := array_to_string(
                                list_slice({_SQL_TOKS}, i * {CHUNK_TOKENS} + 1,
                                           i * {CHUNK_TOKENS} + {CHUNK_TOKENS}), ' ')))) AS u
    FROM documents
  )
),
pass1 AS (
  SELECT doc_id, chunk_idx, chunk,
         MIN(doc_id) OVER (PARTITION BY chunk) AS d0
  FROM inst
),
marked AS (
  SELECT doc_id,
         CASE WHEN doc_id = d0 AND chunk_idx = i0 THEN 0 ELSE 1 END AS is_dup
  FROM (
    SELECT doc_id, chunk_idx, d0,
           MIN(CASE WHEN doc_id = d0 THEN chunk_idx END)
             OVER (PARTITION BY chunk) AS i0
    FROM pass1
  )
)
SELECT doc_id, COUNT(*) AS n_chunks,
       CAST(SUM(is_dup) AS BIGINT) AS n_dup_chunks,
       (COUNT(*) - SUM(is_dup)) / CAST(COUNT(*) AS DOUBLE) AS retained_frac
FROM marked
GROUP BY doc_id
ORDER BY n_dup_chunks DESC, doc_id ASC
LIMIT {CHUNK_TOP_DOCS}
"""


# ---------------------------------------------------------------------------
# Blocked fuzzy join (entity resolution)
# ---------------------------------------------------------------------------

FUZZY_MAX_EDIT = 4  # max Levenshtein distance for a candidate match


def q_fuzzy_blocked_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entity resolution as a blocked fuzzy self-join over ``part`` names:
    candidate matches are pairs of *distinct* name strings that share a
    blocking key (first token, length÷4 bucket) and sit within
    ``FUZZY_MAX_EDIT`` Levenshtein distance.

    Two scale moves, both standard record-linkage practice:
    (1) **collapse to the distinct-entity domain first** — the quadratic
    stage runs over distinct names (with a min-key representative and a
    row count carried along), never raw rows; identical rows are the
    exact-dedup operator's job and contribute nothing here. On data where
    values repeat (this corpus: 2000 rows, 64 names) that alone removes
    ~99% of the pairs. (2) **blocking bounds candidates** — the equi-join
    on (first token, length bucket) caps the pair space at Σ|block|²;
    Levenshtein (the expensive verify) runs only within blocks. An
    unblocked fuzzy join is O(n²) and unshippable at 100 TB; block-key
    granularity is the recall/cost knob. Distinct from
    ``dedup_edit_distance`` (verify stage behind LSH candidates): here
    blocking IS the candidate generator — no sketch pass needed."""
    parts = load_table(spark, sf_dir, "part")
    entities = parts.groupBy("p_name").agg(
        F.min("p_partkey").alias("rep_key"),
        F.count(F.lit(1)).alias("n_rows"),
    )
    blocked = entities.select(
        "p_name",
        "rep_key",
        "n_rows",
        F.element_at(F.split("p_name", " "), 1).alias("blk_tok"),
        F.floor(F.length("p_name") / F.lit(4)).alias("blk_len"),
    )
    a = blocked.select(
        F.col("p_name").alias("name_a"),
        F.col("rep_key").alias("rep_key_a"),
        F.col("n_rows").alias("n_rows_a"),
        "blk_tok",
        "blk_len",
    )
    b = blocked.select(
        F.col("p_name").alias("name_b"),
        F.col("rep_key").alias("rep_key_b"),
        F.col("n_rows").alias("n_rows_b"),
        "blk_tok",
        "blk_len",
    )
    return (
        a.join(b, ["blk_tok", "blk_len"])
        .filter(F.col("name_a") < F.col("name_b"))
        .withColumn("edit_distance", F.levenshtein("name_a", "name_b"))
        .filter(F.col("edit_distance") <= FUZZY_MAX_EDIT)
        .select(
            "name_a",
            "name_b",
            "rep_key_a",
            "rep_key_b",
            "n_rows_a",
            "n_rows_b",
            "edit_distance",
        )
    )


def _sql_fuzzy_blocked_join() -> str:
    return f"""
WITH entities AS (
  SELECT p_name, MIN(p_partkey) AS rep_key, COUNT(*) AS n_rows
  FROM part GROUP BY 1
), blocked AS (
  SELECT p_name, rep_key, n_rows,
         split_part(p_name, ' ', 1) AS blk_tok,
         CAST(floor(length(p_name) / 4) AS BIGINT) AS blk_len
  FROM entities
)
SELECT a.p_name AS name_a, b.p_name AS name_b,
       a.rep_key AS rep_key_a, b.rep_key AS rep_key_b,
       a.n_rows AS n_rows_a, b.n_rows AS n_rows_b,
       CAST(levenshtein(a.p_name, b.p_name) AS INTEGER) AS edit_distance
FROM blocked a JOIN blocked b
  ON a.blk_tok = b.blk_tok AND a.blk_len = b.blk_len AND a.p_name < b.p_name
WHERE levenshtein(a.p_name, b.p_name) <= {FUZZY_MAX_EDIT}
"""


# ---------------------------------------------------------------------------
# Exact-substring duplicate spans (anchor-gram span merge)
# ---------------------------------------------------------------------------

SPAN_GRAM_TOKENS = 6  # anchor length L: finds every duplicated run of ≥ L tokens


def q_dedup_substring_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-substring duplicate-span report per document: merged maximal
    token spans covered by any ``SPAN_GRAM_TOKENS``-token run that occurs
    more than once in the corpus (within- or cross-document).

    This is the third classic dedup modality next to document-level
    (exact/minhash) and chunk-level (``dedup_chunks``): substring-level, as
    in "Deduplicating Training Data Makes Language Models Better" (Lee et
    al. 2022). Their suffix-array scan is a single-machine algorithm; the
    distributed-native equivalent used here is FIXED-LENGTH ANCHORS — every
    duplicated substring of length ≥ L contains a duplicated L-token
    anchor, so anchor positions form a covering of all long duplicate
    runs, and merging overlapping/adjacent anchor intervals per document
    recovers the maximal duplicated spans (span ends may overshoot a
    duplicate run's true end by < L tokens — the standard precision trade
    for making the problem a hash groupBy).

    Plan shape (all relational, zero UDFs): positional-gram posexplode →
    ONE shuffle on the 16-byte gram hash to count occurrences → join
    positions to duplicated grams on the same key → per-doc interval merge
    (gaps-and-islands: running-max window + flag-sum island ids) → per-doc
    rollup, left-joined back to the corpus. At 100 TB only gram *hashes*
    and integer positions ever shuffle, never text; the interval merge is
    keyed by doc_id so the window never sees more than one document's
    anchor positions."""
    k = SPAN_GRAM_TOKENS
    docs = load_table(spark, sf_dir, "documents")
    toks = F.filter(F.split(F.lower(F.col("text")), " "), lambda t: t != "")
    staged = docs.select("doc_id", toks.alias("_toks")).localCheckpoint(eager=True)
    base = staged.select("doc_id", F.size("_toks").alias("n_tokens"))
    grams = (
        staged.filter(F.size("_toks") >= 1)
        .select(
            "doc_id",
            F.size("_toks").alias("n_tokens"),
            F.posexplode(
                F.transform(
                    F.sequence(F.lit(1), F.greatest(F.size("_toks") - k + 1, F.lit(1))),
                    lambda i: F.md5(F.concat_ws(" ", F.slice(F.col("_toks"), i, k))),
                )
            ).alias("pos0", "gram"),
        )
        .select(
            "doc_id",
            "n_tokens",
            (F.col("pos0") + F.lit(1)).alias("pos"),
            "gram",
        )
    )
    dup = (
        grams.groupBy("gram")
        .agg(F.count(F.lit(1)).alias("n_occ"))
        .filter(F.col("n_occ") >= 2)
        .select("gram")
    )
    covered = grams.join(dup, "gram").select(
        "doc_id",
        "pos",
        F.least(F.col("pos") + F.lit(k - 1), F.col("n_tokens")).alias("end_pos"),
    )
    w_prev = (
        Window.partitionBy("doc_id").orderBy("pos").rowsBetween(Window.unboundedPreceding, -1)
    )
    w_run = (
        Window.partitionBy("doc_id").orderBy("pos").rowsBetween(Window.unboundedPreceding, 0)
    )
    prev_end = F.max("end_pos").over(w_prev)
    flagged = covered.withColumn(
        "is_new",
        F.when(prev_end.isNull() | (F.col("pos") > prev_end + F.lit(1)), F.lit(1)).otherwise(
            F.lit(0)
        ),
    ).withColumn("island", F.sum("is_new").over(w_run))
    spans = flagged.groupBy("doc_id", "island").agg(
        (F.max("end_pos") - F.min("pos") + F.lit(1)).alias("span_len")
    )
    per_doc = spans.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_dup_spans"),
        F.sum("span_len").alias("dup_tokens"),
    )
    return base.join(per_doc, "doc_id", "left").select(
        "doc_id",
        F.col("n_tokens").cast("long").alias("n_tokens"),
        F.coalesce(F.col("n_dup_spans"), F.lit(0)).cast("long").alias("n_dup_spans"),
        F.coalesce(F.col("dup_tokens"), F.lit(0)).cast("long").alias("dup_tokens"),
        (
            F.coalesce(F.col("dup_tokens"), F.lit(0)).cast("double")
            / F.nullif(F.col("n_tokens").cast("double"), F.lit(0.0))
        ).alias("dup_frac"),
    )


def _sql_substring_spans() -> str:
    k = SPAN_GRAM_TOKENS
    return f"""
WITH staged AS (SELECT doc_id, {_SQL_TOKS} AS toks FROM documents),
base AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_tokens FROM staged),
pos_list AS (
  SELECT doc_id, len(toks) AS n_tokens, toks,
         unnest(generate_series(1, greatest(len(toks) - {k} + 1, 1))) AS pos
  FROM staged WHERE len(toks) >= 1
), grams AS (
  SELECT doc_id, n_tokens, pos,
         md5(array_to_string(list_slice(toks, pos, pos + {k} - 1), ' ')) AS gram
  FROM pos_list
), dup AS (
  SELECT gram FROM grams GROUP BY gram HAVING COUNT(*) >= 2
), covered AS (
  SELECT g.doc_id, g.pos, least(g.pos + {k} - 1, g.n_tokens) AS end_pos
  FROM grams g JOIN dup USING (gram)
), flagged AS (
  SELECT doc_id, pos, end_pos,
         CASE WHEN MAX(end_pos) OVER (PARTITION BY doc_id ORDER BY pos
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) IS NULL
              OR pos > MAX(end_pos) OVER (PARTITION BY doc_id ORDER BY pos
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) + 1
              THEN 1 ELSE 0 END AS is_new
  FROM covered
), islands AS (
  SELECT doc_id, pos, end_pos,
         SUM(is_new) OVER (PARTITION BY doc_id ORDER BY pos
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
  FROM flagged
), spans AS (
  SELECT doc_id, island, MAX(end_pos) - MIN(pos) + 1 AS span_len
  FROM islands GROUP BY 1, 2
), per_doc AS (
  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_dup_spans,
         CAST(SUM(span_len) AS BIGINT) AS dup_tokens
  FROM spans GROUP BY 1
)
SELECT b.doc_id, b.n_tokens,
       CAST(COALESCE(p.n_dup_spans, 0) AS BIGINT) AS n_dup_spans,
       CAST(COALESCE(p.dup_tokens, 0) AS BIGINT) AS dup_tokens,
       CAST(COALESCE(p.dup_tokens, 0) AS DOUBLE)
         / nullif(CAST(b.n_tokens AS DOUBLE), 0.0) AS dup_frac
FROM base b LEFT JOIN per_doc p USING (doc_id)
"""


# ---------------------------------------------------------------------------
# Containment near-dup (asymmetric shingle-set inclusion)
# ---------------------------------------------------------------------------

CONTAINMENT_MIN = 0.8  # report pairs where ≥80% of the smaller side's shingles recur


def q_dedup_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Directed containment near-dup pairs: C(a→b) = |S(a) ∩ S(b)| / |S(a)|
    over DF-capped word-3-gram shingle sets, emitting pairs with
    containment ≥ {CONTAINMENT_MIN}.

    Jaccard (``dedup_ngram_jaccard``) misses the subset/quote case — a
    short document wholly embedded in a long one scores low symmetric
    similarity but containment 1.0. This is the Broder (1997) containment
    coefficient, the standard screen for quote-expansion and
    version-superset duplicates in training corpora. Same inverted-index
    economics as the Jaccard verify stage (DF cap bounds posting lists;
    only shingle hashes shuffle); directed output, both orientations of an
    asymmetric pair can appear."""
    sh = _shingles_df(spark, sf_dir)
    df_w = Window.partitionBy("shingle")
    kept = (
        sh.withColumn("df", F.count(F.lit(1)).over(df_w))
        .filter(F.col("df") <= MAX_SHINGLE_DF)
        .drop("df")
        .localCheckpoint(eager=True)
    )
    sizes = kept.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    a = kept.select(F.col("doc_id").alias("doc_a"), "shingle")
    b = kept.select(F.col("doc_id").alias("doc_b"), "shingle")
    common = (
        a.join(b, "shingle")
        .filter(F.col("doc_a") != F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("n_a"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("n_b"))
    out = (
        common.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            "n_common",
            "n_a",
            "n_b",
            (F.col("n_common").cast("double") / F.col("n_a").cast("double")).alias(
                "containment"
            ),
        )
        .filter(F.col("containment") >= F.lit(CONTAINMENT_MIN))
    )
    return out.orderBy(
        F.col("containment").desc(), F.col("doc_a").asc(), F.col("doc_b").asc()
    ).limit(50)


def _sql_containment() -> str:
    return f"""
WITH shingles AS ({_SQL_SHINGLES}),
rare AS (SELECT shingle FROM shingles GROUP BY shingle HAVING COUNT(*) <= {MAX_SHINGLE_DF}),
kept AS (SELECT s.doc_id, s.shingle FROM shingles s JOIN rare USING (shingle)),
sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM kept GROUP BY 1),
common AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_common
  FROM kept a JOIN kept b USING (shingle)
  WHERE a.doc_id <> b.doc_id
  GROUP BY 1, 2
)
SELECT doc_a, doc_b, n_common, sa.n_sh AS n_a, sb.n_sh AS n_b,
       CAST(n_common AS DOUBLE) / CAST(sa.n_sh AS DOUBLE) AS containment
FROM common
JOIN sizes sa ON sa.doc_id = doc_a
JOIN sizes sb ON sb.doc_id = doc_b
WHERE CAST(n_common AS DOUBLE) / CAST(sa.n_sh AS DOUBLE) >= {CONTAINMENT_MIN}
ORDER BY containment DESC, doc_a ASC, doc_b ASC
LIMIT 50
"""


# ---------------------------------------------------------------------------
# Damerau–Levenshtein record linkage (blocked, transposition-aware)
# ---------------------------------------------------------------------------

DAMERAU_MAX = 3  # max full-DL distance for a linked pair


def q_fuzzy_damerau_linkage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Record linkage over distinct ``part`` names using FULL (unrestricted)
    Damerau–Levenshtein distance — edit distance where a transposition of
    two adjacent characters costs 1, the right metric for typo-shaped
    entity duplicates ("hte" ↔ "the" is one error, not two).

    Same two scale moves as ``fuzzy_blocked_join`` (collapse to the
    distinct-name domain, equi-join on a (first-token, length-bucket)
    blocking key so the quadratic verify is Σ|block|² bounded). The
    verify itself is the textbook alphabet-indexed DP in an
    Arrow-batched pandas UDF — Spark has no Damerau builtin; per-pair
    Python cost is confined to the block-bounded candidate stage, which
    is exactly where record-linkage systems put their expensive
    comparator. The oracle is DuckDB's independent native
    ``damerau_levenshtein`` (verified unrestricted: ('CA','ABC') → 2),
    so the gate cross-checks two genuinely independent implementations
    of the metric, integer-valued — no float portability surface."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("int")
    def dl_dist(sa, sb):  # nested: pickled by value (workers can't import pkg)
        import pandas as pd

        def dl(a: str, b: str) -> int:
            # full DL with the da[] alphabet map (Lowrance–Wagner)
            da = {}
            la, lb = len(a), len(b)
            maxd = la + lb
            d = [[maxd] * (lb + 2) for _ in range(la + 2)]
            for i in range(la + 1):
                d[i + 1][1] = i
            for j in range(lb + 1):
                d[1][j + 1] = j
            for i in range(1, la + 1):
                db = 0
                for j in range(1, lb + 1):
                    k = da.get(b[j - 1], 0)
                    l = db
                    if a[i - 1] == b[j - 1]:
                        cost = 0
                        db = j
                    else:
                        cost = 1
                    d[i + 1][j + 1] = min(
                        d[i][j] + cost,  # substitute
                        d[i + 1][j] + 1,  # insert
                        d[i][j + 1] + 1,  # delete
                        d[k][l] + (i - k - 1) + 1 + (j - l - 1),  # transpose
                    )
                da[a[i - 1]] = i
            return d[la + 1][lb + 1]

        return pd.Series(
            [dl(x, y) for x, y in zip(sa, sb)], dtype="int32"
        )

    parts = load_table(spark, sf_dir, "part")
    entities = parts.groupBy("p_name").agg(F.min("p_partkey").alias("rep_key"))
    blocked = entities.select(
        "p_name",
        "rep_key",
        F.element_at(F.split("p_name", " "), 1).alias("blk_tok"),
        F.floor(F.length("p_name") / F.lit(4)).alias("blk_len"),
    )
    a = blocked.select(
        F.col("p_name").alias("name_a"), F.col("rep_key").alias("rep_key_a"),
        "blk_tok", "blk_len",
    )
    b = blocked.select(
        F.col("p_name").alias("name_b"), F.col("rep_key").alias("rep_key_b"),
        "blk_tok", "blk_len",
    )
    return (
        a.join(b, ["blk_tok", "blk_len"])
        .filter(F.col("name_a") < F.col("name_b"))
        .withColumn("dl_distance", dl_dist("name_a", "name_b"))
        .filter(F.col("dl_distance") <= DAMERAU_MAX)
        .withColumn("lev_distance", F.levenshtein("name_a", "name_b"))
        .select(
            "name_a", "name_b", "rep_key_a", "rep_key_b",
            "dl_distance", "lev_distance",
        )
        .orderBy("name_a", "name_b")
    )


_ORACLE_DAMERAU = f"""
WITH entities AS (
  SELECT p_name, MIN(p_partkey) AS rep_key FROM part GROUP BY p_name
), blocked AS (
  SELECT p_name, rep_key,
         string_split(p_name, ' ')[1] AS blk_tok,
         CAST(floor(length(p_name) / 4) AS BIGINT) AS blk_len
  FROM entities
)
SELECT a.p_name AS name_a, b.p_name AS name_b,
       a.rep_key AS rep_key_a, b.rep_key AS rep_key_b,
       CAST(damerau_levenshtein(a.p_name, b.p_name) AS INTEGER) AS dl_distance,
       CAST(levenshtein(a.p_name, b.p_name) AS INTEGER) AS lev_distance
FROM blocked a JOIN blocked b USING (blk_tok, blk_len)
WHERE a.p_name < b.p_name
  AND damerau_levenshtein(a.p_name, b.p_name) <= {DAMERAU_MAX}
ORDER BY name_a, name_b
"""


# ---------------------------------------------------------------------------
# Sorted-neighborhood dedup (Hernandez–Stolfo merge/purge blocking)
# ---------------------------------------------------------------------------

SNM_WINDOW = 3        # compare each record to its w successors in key order
SNM_KEY_LEN = 16      # sort key: first chars of the lowercased text
SNM_THRESHOLD = 0.3   # token-Jaccard match floor


def q_dedup_sorted_neighborhood(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sorted-neighborhood near-duplicate detection (Hernández & Stolfo's
    merge/purge): sort the corpus by a fuzzy key (lowercased {k}-char
    prefix), then compare each record only to its {w} successors — the
    THIRD blocking discipline in the dedup family, next to hash blocking
    (``dedup_exact``/``fuzzy_blocked_join``) and LSH banding
    (``dedup_minhash_lsh``). SNM's candidate set is O(n·w) by
    construction with NO hot-bucket risk — the property that made it the
    classic record-linkage default — at the price of missing pairs whose
    keys sort far apart (the documented recall trade).

    Exactness: the neighbor pairing is integer rank arithmetic over a
    total order ((key, doc_id)); the verifier is exact distinct-token
    Jaccard |∩|/(|a|+|b|−|∩|) — ONE division of exact integers per pair.
    Scale shape: the global rank is the BUCKETED decomposition from
    ``breadth.q_global_rank_bucketed`` (per-bucket parallel windows plus
    a broadcast cross-bucket offset table), NOT an unpartitioned window —
    the string sort key buckets by a codepoint-packed integer of its
    first 3 chars, which is monotone in UTF-8 binary order (what both
    Spark and DuckDB compare strings by), so bucket order is key order
    and equal keys never straddle buckets. The offset table is one row
    per DISTINCT 3-char prefix (corpus-alphabet-bounded, not data-sized).
    The oracle stays the PLAIN unpartitioned ROW_NUMBER, so the gate
    proves the decomposition value-identical. Then an equi-join on rank
    offsets — n·{w} comparisons total, each on pre-tokenized arrays.
    """
    from us_flight_bigdata_dashboard_spark.operators.text import _tokens

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.substring(F.lower(F.col("text")), 1, SNM_KEY_LEN).alias("k"),
        F.array_distinct(_tokens(F.col("text"))).alias("toks"),
    )
    # Monotone string→integer bucket: pack the first 3 codepoints at
    # radix 2^21 (> max Unicode codepoint), missing chars pad with 0 —
    # consistent with lexicographic order on the full key.
    def _cp(i: int):
        ch = F.substring("k", i, 1)
        return F.when(F.length(ch) == 0, F.lit(0)).otherwise(F.ascii(ch))

    key_b = (
        _cp(1).cast("long") * F.lit(1 << 42)
        + _cp(2).cast("long") * F.lit(1 << 21)
        + _cp(3).cast("long")
    )
    bucketed = docs.withColumn("_b", key_b)
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
    w_b = Window.partitionBy("_b").orderBy("k", "doc_id")
    ranked = (
        bucketed.join(F.broadcast(offsets), "_b")
        .select(
            "doc_id",
            "toks",
            (F.col("_offset") + F.row_number().over(w_b)).alias("rn"),
        )
    )
    a = ranked.select(
        F.col("doc_id").alias("doc_a"),
        F.col("toks").alias("toks_a"),
        "rn",
        F.explode(F.sequence(F.lit(1), F.lit(SNM_WINDOW))).alias("off"),
    ).select("doc_a", "toks_a", (F.col("rn") + F.col("off")).alias("rn_b"))
    b = ranked.select(
        F.col("doc_id").alias("doc_b"), F.col("toks").alias("toks_b"),
        F.col("rn").alias("rn_b"),
    )
    inter = F.size(F.array_intersect(F.col("toks_a"), F.col("toks_b")))
    na, nb = F.size("toks_a"), F.size("toks_b")
    pairs = a.join(b, "rn_b").select(
        "doc_a",
        "doc_b",
        inter.alias("n_common"),
        na.alias("n_a"),
        nb.alias("n_b"),
    )
    jac = F.col("n_common").cast("double") / (
        F.col("n_a") + F.col("n_b") - F.col("n_common")
    ).cast("double")
    return (
        pairs.select("doc_a", "doc_b", "n_common", jac.alias("jaccard"))
        .filter(F.col("jaccard") >= SNM_THRESHOLD)
        .orderBy("doc_a", "doc_b")
    )
q_dedup_sorted_neighborhood.__doc__ = q_dedup_sorted_neighborhood.__doc__ and q_dedup_sorted_neighborhood.__doc__.format(w=SNM_WINDOW, k=SNM_KEY_LEN)


_ORACLE_SNM_TMPL = f"""
WITH ranked AS (
  SELECT doc_id,
         list_distinct({{tok}}) AS toks,
         ROW_NUMBER() OVER (ORDER BY SUBSTRING(LOWER(text), 1, {SNM_KEY_LEN}),
                            doc_id) AS rn
  FROM documents
), a AS (
  SELECT doc_id AS doc_a, toks AS toks_a, rn + off.k AS rn_b
  FROM ranked, (SELECT unnest(generate_series(1, {SNM_WINDOW})) AS k) off
), pairs AS (
  SELECT a.doc_a, b.doc_id AS doc_b,
         CAST(len(list_intersect(a.toks_a, b.toks)) AS BIGINT) AS n_common,
         CAST(len(a.toks_a) AS BIGINT) AS n_a,
         CAST(len(b.toks) AS BIGINT) AS n_b
  FROM a JOIN ranked b ON a.rn_b = b.rn
)
SELECT doc_a, doc_b, n_common,
       CAST(n_common AS DOUBLE) / CAST(n_a + n_b - n_common AS DOUBLE) AS jaccard
FROM pairs
WHERE CAST(n_common AS DOUBLE) / CAST(n_a + n_b - n_common AS DOUBLE)
      >= {SNM_THRESHOLD}
ORDER BY doc_a, doc_b
"""


from us_flight_bigdata_dashboard_spark.operators.text import _sql_tokens as _snm_sql_tokens  # noqa: E402

_ORACLE_SNM = _ORACLE_SNM_TMPL.format(tok=_snm_sql_tokens("text"))

# ---------------------------------------------------------------------------
# Capture–recapture vocabulary-coverage estimate (Chapman estimator)
# ---------------------------------------------------------------------------

CR_NGRAM = 3  # shingle unit for the two "capture occasions"


def q_capture_recapture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Capture–recapture (Lincoln–Petersen, Chapman-corrected) estimate of
    the corpus's TOTAL distinct word-{n}-gram vocabulary from two
    independent "capture occasions": even- vs odd-numbered sources. The
    ecology estimator maps directly onto corpus curation — how much
    vocabulary does the whole population hold if two crawls sampled it
    independently? N̂ = (n₁+1)(n₂+1)/(m+1) − 1 with its closed-form
    standard error; the exact union distinct is reported beside it (at
    real sf both occasions cover the population well, so N̂ ≈ union —
    the crafted test plants partial overlap where the estimator genuinely
    extrapolates).

    Exactness: n₁, n₂, m, union are exact integer counts from one
    per-shingle flag agg (distinct (occasion, shingle) pairs → two max
    flags per shingle → one global sum); the estimate and its SE are one
    fixed IEEE sequence on those integers (sqrt is the allowlisted
    irrational). Scale: bounded by the distinct-shingle domain, never
    the document count — the source_overlap_matrix shape with a 2-flag
    reduction instead of a pair join."""
    docs = load_table(spark, sf_dir, "documents")
    occ = (
        F.regexp_replace(F.col("source"), "[^0-9]", "").cast("long") % 2
    ).alias("occ")
    sh = (
        shingles_exploded(docs, n_words=CR_NGRAM, keep=("source",))
        .select(occ, "shingle")
        .distinct()
    )
    flags = sh.groupBy("shingle").agg(
        F.max(F.when(F.col("occ") == 0, 1).otherwise(0)).alias("in1"),
        F.max(F.when(F.col("occ") == 1, 1).otherwise(0)).alias("in2"),
    )
    red = flags.agg(
        F.sum("in1").cast("long").alias("n1"),
        F.sum("in2").cast("long").alias("n2"),
        F.sum(F.col("in1") * F.col("in2")).cast("long").alias("m"),
        F.count(F.lit(1)).cast("long").alias("n_union_exact"),
    )
    n1 = F.col("n1").cast("double")
    n2 = F.col("n2").cast("double")
    md = F.col("m").cast("double")
    est = (n1 + F.lit(1.0)) * (n2 + F.lit(1.0)) / (md + F.lit(1.0)) - F.lit(1.0)
    var = (
        (n1 + F.lit(1.0))
        * (n2 + F.lit(1.0))
        * (n1 - md)
        * (n2 - md)
        / ((md + F.lit(1.0)) * (md + F.lit(1.0)) * (md + F.lit(2.0)))
    )
    return red.select(
        "n1",
        "n2",
        "m",
        "n_union_exact",
        est.alias("chapman_est"),
        F.sqrt(var).alias("se_est"),
    )


def _sql_capture_recapture() -> str:
    return f"""
WITH sh AS (
  SELECT DISTINCT
         CAST(regexp_replace(source, '[^0-9]', '', 'g') AS BIGINT) % 2 AS occ,
         shingle
  FROM (
    SELECT source, unnest({_sql_shingle_list(CR_NGRAM)}) AS shingle
    FROM documents
  )
), flags AS (
  SELECT shingle,
         MAX(CASE WHEN occ = 0 THEN 1 ELSE 0 END) AS in1,
         MAX(CASE WHEN occ = 1 THEN 1 ELSE 0 END) AS in2
  FROM sh GROUP BY 1
), red AS (
  SELECT CAST(SUM(in1) AS BIGINT) AS n1,
         CAST(SUM(in2) AS BIGINT) AS n2,
         CAST(SUM(in1 * in2) AS BIGINT) AS m,
         CAST(COUNT(*) AS BIGINT) AS n_union_exact
  FROM flags
)
SELECT n1, n2, m, n_union_exact,
       (CAST(n1 AS DOUBLE) + 1.0) * (CAST(n2 AS DOUBLE) + 1.0)
         / (CAST(m AS DOUBLE) + 1.0) - 1.0 AS chapman_est,
       sqrt((CAST(n1 AS DOUBLE) + 1.0) * (CAST(n2 AS DOUBLE) + 1.0)
            * (CAST(n1 AS DOUBLE) - CAST(m AS DOUBLE))
            * (CAST(n2 AS DOUBLE) - CAST(m AS DOUBLE))
            / ((CAST(m AS DOUBLE) + 1.0) * (CAST(m AS DOUBLE) + 1.0)
               * (CAST(m AS DOUBLE) + 2.0))) AS se_est
FROM red
"""


q_capture_recapture.__doc__ = q_capture_recapture.__doc__ and q_capture_recapture.__doc__.replace("{n}", str(CR_NGRAM))


QUERIES = {
    "capture_recapture": q_capture_recapture,
    "dedup_exact": q_dedup_exact,
    "dedup_edit_distance": q_dedup_edit_distance,
    "dedup_normalized": q_dedup_normalized,
    "dedup_minhash_lsh": q_dedup_minhash_lsh,
    "dedup_ngram_jaccard": q_dedup_ngram_jaccard,
    "dedup_simhash": q_dedup_simhash,
    "dedup_clusters": q_dedup_clusters,
    "dedup_clusters_ls": q_dedup_clusters_ls,
    "dedup_incremental": q_dedup_incremental,
    "dedup_keep_best": q_dedup_keep_best,
    "dedup_chunks": q_dedup_chunks,
    "fuzzy_blocked_join": q_fuzzy_blocked_join,
    "source_overlap_matrix": q_source_overlap_matrix,
    "dedup_substring_spans": q_dedup_substring_spans,
    "dedup_containment": q_dedup_containment,
    "fuzzy_damerau_linkage": q_fuzzy_damerau_linkage,
    "dedup_sorted_neighborhood": q_dedup_sorted_neighborhood,
    "dedup_minhash_eval": q_dedup_minhash_eval,
    "fs_record_linkage": q_fs_record_linkage,
}

ORACLE = {
    "dedup_exact": _ORACLE_DEDUP_EXACT,
    "dedup_edit_distance": _sql_edit_distance(),
    "dedup_normalized": _ORACLE_DEDUP_NORMALIZED,
    "dedup_minhash_lsh": _sql_minhash_lsh(),
    "dedup_ngram_jaccard": _sql_ngram_jaccard(),
    "dedup_simhash": _sql_simhash(),
    "dedup_clusters": _sql_dedup_clusters(),
    "dedup_clusters_ls": _sql_dedup_clusters(),
    "dedup_incremental": _sql_dedup_incremental(),
    "dedup_keep_best": _sql_dedup_keep_best(),
    "dedup_chunks": _ORACLE_DEDUP_CHUNKS,
    "fuzzy_blocked_join": _sql_fuzzy_blocked_join(),
    "source_overlap_matrix": _sql_source_overlap(),
    "capture_recapture": _sql_capture_recapture(),
    "dedup_substring_spans": _sql_substring_spans(),
    "dedup_containment": _sql_containment(),
    "fuzzy_damerau_linkage": _ORACLE_DAMERAU,
    "dedup_sorted_neighborhood": _ORACLE_SNM,
    "dedup_minhash_eval": _sql_minhash_eval(),
    "fs_record_linkage": _sql_fs_linkage(),
}
