"""Reproducible sampling, splitting and benchmark decontamination over
``documents`` — the curation stages of a training-data pipeline that sit
between dedup and training (north-star extension).

All three use *deterministic content hashes* instead of RNG sampling
(``df.sample``/``sampleBy`` draw from a seeded RNG whose row order
dependence makes results partition-dependent — unacceptable for a
reproducible data pipeline, and impossible to oracle). The hash bucket is
the portable md5 construction from the dedup family: first 15 hex digits
parsed as int64 (exact in both engines), mod 100. The same document lands
in the same split on every run, every engine, every partitioning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from us_flight_bigdata_dashboard_spark.operators.dedup import (
    _sql_hex_to_int,
    _sql_shingles,
    shingles_exploded,
)
from us_flight_bigdata_dashboard_spark.operators.similarity import _norm, _sql_dot
from us_flight_bigdata_dashboard_spark.operators.text import _sql_tokens, _tokens
from us_flight_bigdata_dashboard_spark.operators.statistics import _CUM_BUCKETS, _cum_prev
from us_flight_bigdata_dashboard_spark.sources.catalog import load_table
from us_flight_bigdata_dashboard_spark.functions.exact import (
    dec_to_double,
    fsum,
    sql_dec_to_double,
    sql_fsum,
)

# per-language keep percentage (language rebalancing: downsample the
# over-represented head, keep more of the tail)
STRATA_PCT = {"en": 50, "zh": 20}
STRATA_DEFAULT_PCT = 10

SPLIT_TRAIN_PCT = 80  # [0,80) train, [80,90) valid, [90,100) test
SPLIT_VALID_PCT = 90

DECONTAM_NGRAM = 8
BENCH_DOC_FRAC = 0.02  # benchmark set = first 2% of doc_ids (scale-relative)


def _bucket_col() -> F.Column:
    """Deterministic 0-99 bucket from md5(doc_id) — narrow, shuffle-free,
    identical in every engine/run/partitioning."""
    return (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 15), 16, 10).cast("bigint")
        % 100
    )


def _sql_bucket() -> str:
    return f"({_sql_hex_to_int('md5(CAST(doc_id AS VARCHAR))', 1, 15)} % 100)"


def q_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified (per-language) downsampling: keep bucket < rate(lang).
    The plan is a narrow filter over the scan — zero shuffles, and the
    sample is reproducible by construction (same doc ids survive at 100 TB
    no matter the partitioning)."""
    docs = load_table(spark, sf_dir, "documents")
    rate = F.when(F.col("lang") == "en", F.lit(STRATA_PCT["en"]))
    rate = rate.when(F.col("lang") == "zh", F.lit(STRATA_PCT["zh"]))
    rate = rate.otherwise(F.lit(STRATA_DEFAULT_PCT))
    return (
        docs.select("doc_id", "lang", _bucket_col().alias("sample_bucket"))
        .filter(F.col("sample_bucket") < rate)
    )


_ORACLE_STRATIFIED_SAMPLE = f"""
SELECT doc_id, lang, sample_bucket FROM (
  SELECT doc_id, lang, {_sql_bucket()} AS sample_bucket FROM documents
)
WHERE sample_bucket < (CASE lang WHEN 'en' THEN {STRATA_PCT["en"]}
                                 WHEN 'zh' THEN {STRATA_PCT["zh"]}
                                 ELSE {STRATA_DEFAULT_PCT} END)
"""


def q_split_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/valid/test assignment (80/10/10 by hash bucket)
    summarized per language — the reproducible replacement for
    ``randomSplit`` (whose assignment depends on partition layout)."""
    docs = load_table(spark, sf_dir, "documents")
    bucket = _bucket_col()
    split = (
        F.when(bucket < SPLIT_TRAIN_PCT, F.lit("train"))
        .when(bucket < SPLIT_VALID_PCT, F.lit("valid"))
        .otherwise(F.lit("test"))
    )
    return (
        docs.select("lang", split.alias("split"))
        .groupBy("lang", "split")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )


_ORACLE_SPLIT_ASSIGN = f"""
SELECT lang,
       CASE WHEN b < {SPLIT_TRAIN_PCT} THEN 'train'
            WHEN b < {SPLIT_VALID_PCT} THEN 'valid'
            ELSE 'test' END AS split,
       COUNT(*) AS n_docs
FROM (SELECT lang, {_sql_bucket()} AS b FROM documents)
GROUP BY 1, 2
"""


def q_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: corpus documents sharing at least one
    word-8-gram with the benchmark set (here: the first 2% of doc_ids
    stands in for an eval suite), with the overlap count. 8-grams are the
    published decontamination unit (GPT-3 used 13-grams, Gopher 8-grams —
    long enough that natural reuse is rare). The benchmark cut is
    RELATIVE (``floor(0.02 · n_docs)``): an absolute doc count shrinks to
    a vanishing sliver of a growing corpus and the gate degenerates to an
    empty (vacuous) compare.

    Scale shape: benchmark suites are tiny versus the corpus, so the
    benchmark's distinct shingle set broadcasts; the corpus side is a
    narrow explode + broadcast semi-shaped join + one aggregation over the
    (few) contaminated docs. The corpus never shuffles its text."""
    docs = load_table(spark, sf_dir, "documents")
    n_bench = int(docs.count() * BENCH_DOC_FRAC)  # parquet metadata count
    sh = shingles_exploded(docs, n_words=DECONTAM_NGRAM)
    bench = (
        sh.filter(F.col("doc_id") < n_bench).select("shingle").distinct()
    )
    return (
        sh.filter(F.col("doc_id") >= n_bench)
        .join(F.broadcast(bench), "shingle")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_overlap_shingles"))
    )


_ORACLE_DECONTAMINATE = f"""
WITH sh AS ({_sql_shingles(DECONTAM_NGRAM)}),
bench AS (SELECT DISTINCT shingle FROM sh
          WHERE doc_id < (SELECT CAST(floor(COUNT(*) * {BENCH_DOC_FRAC}) AS BIGINT) FROM documents))
SELECT s.doc_id, COUNT(*) AS n_overlap_shingles
FROM sh s JOIN bench USING (shingle)
WHERE s.doc_id >= (SELECT CAST(floor(COUNT(*) * {BENCH_DOC_FRAC}) AS BIGINT) FROM documents)
GROUP BY 1
"""


def q_curation_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end curation: quality gate → exact-dup removal → split
    assignment, composed from this engine's own stages — the chain a
    training-data pipeline runs nightly, as ONE declarative plan (each
    stage is a lazy transformation, so Catalyst sees the whole pipeline and
    pushes the quality predicates into the scan).

    Stage shapes at 100 TB: the quality gate is a narrow projection+filter
    (pure column expressions, no shuffle); dedup is one keyed window on the
    normalization fingerprint (single shuffle; keeps the lowest doc_id per
    fingerprint — deterministic keeper); split assignment is again narrow
    (content-hash bucket). Net: one shuffle for the whole pipeline, and the
    text column itself never shuffles (only doc_id + fingerprint do,
    because the window only needs the key and the projected survivors
    re-join nothing)."""
    docs = load_table(spark, sf_dir, "documents")
    toks = _tokens(F.col("text"))
    n_tok = F.size(toks)
    n_tok_nz = F.nullif(n_tok, F.lit(0))
    n_chars_nz = F.nullif(F.length("text"), F.lit(0))
    n_sym = F.length(F.regexp_replace(F.col("text"), "[A-Za-z0-9\\s]", ""))
    mean_tok = F.length("text").cast("double") / n_tok_nz
    sym_ratio = n_sym.cast("double") / n_chars_nz
    norm = F.trim(
        F.regexp_replace(F.regexp_replace(F.lower(F.col("text")), "[^a-z0-9]+", " "), " +", " ")
    )
    quality = (
        docs.select(
            "doc_id",
            "lang",
            n_tok.alias("n_tokens"),
            F.md5(norm).alias("fingerprint"),
        )
        .filter(
            (n_tok >= 10) & (mean_tok >= 3.0) & (mean_tok <= 12.0) & (sym_ratio <= 0.1)
        )
    )
    w = Window.partitionBy("fingerprint").orderBy(F.col("doc_id").asc())
    deduped = (
        quality.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") == 1).drop("rn")
    )
    bucket = _bucket_col()
    split = (
        F.when(bucket < SPLIT_TRAIN_PCT, F.lit("train"))
        .when(bucket < SPLIT_VALID_PCT, F.lit("valid"))
        .otherwise(F.lit("test"))
    )
    return deduped.select("doc_id", "lang", "n_tokens", "fingerprint", split.alias("split"))


_ORACLE_CURATION_PIPELINE = f"""
WITH quality AS (
  SELECT doc_id, lang,
         CAST(len({_sql_tokens("text")}) AS INTEGER) AS n_tokens,
         md5(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'), ' +', ' ', 'g'))) AS fingerprint
  FROM documents
  WHERE len({_sql_tokens("text")}) >= 10
    AND CAST(length(text) AS DOUBLE) / nullif(len({_sql_tokens("text")}), 0) BETWEEN 3.0 AND 12.0
    AND CAST(length(regexp_replace(text, '[A-Za-z0-9\\s]', '', 'g')) AS DOUBLE)
          / nullif(length(text), 0) <= 0.1
), deduped AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY fingerprint ORDER BY doc_id ASC) AS rn
  FROM quality
)
SELECT doc_id, lang, n_tokens, fingerprint,
       CASE WHEN {_sql_bucket()} < {SPLIT_TRAIN_PCT} THEN 'train'
            WHEN {_sql_bucket()} < {SPLIT_VALID_PCT} THEN 'valid'
            ELSE 'test' END AS split
FROM deduped WHERE rn = 1
"""


PACK_TARGET_TOKENS = 2048
PACK_SHARDS = 8


def q_sequence_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy sequence packing: assemble documents into training batches of
    ~``PACK_TARGET_TOKENS`` whitespace tokens (the batch-assembly step
    between curation and the trainer's data loader).

    The naive formulation is a running token sum over a GLOBAL document
    order — a single-partition window that cannot scale. This operator
    uses the two-level shape instead: documents hash into
    ``PACK_SHARDS`` independent shards (deterministic content hash, no
    RNG), each shard packs in parallel with its own running sum over a
    deterministic intra-shard order, and the global batch id is
    ``shard * 2^32 + local_batch`` — disjoint by construction. At 100 TB
    you raise the shard count to match parallelism; packing quality is
    unaffected because batches never straddle shards by design. A doc
    longer than the target gets its own batch (floor of its start offset
    still lands it in exactly one batch)."""
    docs = load_table(spark, sf_dir, "documents")
    n_tok = F.size(_tokens(F.col("text")))
    order_key = F.md5(F.col("doc_id").cast("string"))
    shard = _bucket_col() % PACK_SHARDS
    w = (
        Window.partitionBy("shard")
        .orderBy(F.col("order_key").asc(), F.col("doc_id").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    packed = (
        docs.select(
            "doc_id",
            n_tok.alias("n_tokens"),
            order_key.alias("order_key"),
            shard.cast("int").alias("shard"),
        )
        .withColumn("cum_tokens", F.sum("n_tokens").over(w))
        .withColumn("start_offset", (F.col("cum_tokens") - F.col("n_tokens")))
        .withColumn(
            "batch_id",
            F.col("shard").cast("bigint") * F.lit(2**32)
            + F.floor(F.col("start_offset") / PACK_TARGET_TOKENS),
        )
    )
    return packed.select("doc_id", "shard", "n_tokens", "start_offset", "batch_id")


_ORACLE_SEQUENCE_PACK = f"""
WITH sized AS (
  SELECT doc_id,
         CAST(len({_sql_tokens("text")}) AS INTEGER) AS n_tokens,
         md5(CAST(doc_id AS VARCHAR)) AS order_key,
         CAST({_sql_bucket()} % {PACK_SHARDS} AS INTEGER) AS shard
  FROM documents
), packed AS (
  SELECT doc_id, shard, n_tokens,
         SUM(n_tokens) OVER (PARTITION BY shard ORDER BY order_key ASC, doc_id ASC
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           - n_tokens AS start_offset
  FROM sized
)
SELECT doc_id, shard, n_tokens, CAST(start_offset AS BIGINT) AS start_offset,
       CAST(shard AS BIGINT) * {2**32}
         + CAST(floor(CAST(start_offset AS DOUBLE) / {PACK_TARGET_TOKENS}) AS BIGINT) AS batch_id
FROM packed
"""


MAX_COMPONENT = 0.33  # unit vectors concentrating >33% of mass in one axis are spiky


def q_multimodal_curation_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fused text+vector curation: keep documents that pass the token-count
    gate AND whose unit embedding is not *spiky* (max |component| over a
    threshold flags near-one-hot encoder degenerations; the corpus is
    unit-normalized, so a norm band would be vacuous — the component test
    is the meaningful vector-side sanity filter before ANN indexing).

    Cross-modal shape at 100 TB: both sides reduce BEFORE the join — the
    text side to (doc_id, n_tokens) and the vector side to (vec_id, norm,
    max_component), a narrow fold per row — so the equi-join on the id
    shuffles three slim columns, never text or embedding payloads. Spark
    picks a sort-merge join (equal-sized sides); co-bucketing both tables
    by id makes it shuffle-free."""
    docs = load_table(spark, sf_dir, "documents")
    emb = load_table(spark, sf_dir, "embeddings")
    text_side = docs.select(
        "doc_id", F.size(_tokens(F.col("text"))).alias("n_tokens")
    ).filter(F.col("n_tokens") >= 10)
    max_comp = F.array_max(F.transform("embedding", lambda x: F.abs(x.cast("double"))))
    vec_side = emb.select(
        F.col("vec_id").alias("doc_id"),
        _norm(F.col("embedding")).alias("l2_norm"),
        max_comp.alias("max_component"),
    ).filter(F.col("max_component") <= MAX_COMPONENT)
    return text_side.join(vec_side, "doc_id").select(
        "doc_id", "n_tokens", "l2_norm", "max_component"
    )


_ORACLE_MULTIMODAL_CURATION_JOIN = f"""
WITH text_side AS (
  SELECT doc_id, CAST(len({_sql_tokens("text")}) AS INTEGER) AS n_tokens
  FROM documents
  WHERE len({_sql_tokens("text")}) >= 10
), vec_side AS (
  SELECT vec_id AS doc_id,
         sqrt({_sql_dot("embedding", "embedding")}) AS l2_norm,
         list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))) AS max_component
  FROM embeddings
  WHERE list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))) <= {MAX_COMPONENT}
)
SELECT doc_id, n_tokens, l2_norm, max_component
FROM text_side JOIN vec_side USING (doc_id)
"""


# ---------------------------------------------------------------------------
# Domain mixture weights (temperature sampling)
# ---------------------------------------------------------------------------

MIXTURE_BUDGET = 1_000_000  # documents per training epoch


def q_domain_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-based domain mixture weights: weight(domain) ∝ count^α
    with α = 0.5, the standard up-weighting of tail domains when mixing
    corpora for LM training (multilingual BERT / XLM-R exponentiated
    sampling; α<1 flattens the head).

    α is fixed at 0.5 because ``sqrt`` is IEEE-754 correctly-rounded on
    every engine, so the weights are bit-identical in Spark and DuckDB
    (``pow(x, 0.3)`` is NOT correctly-rounded and may differ in the last
    ulp between libm implementations — a generic-α variant would need a
    tolerance oracle). The sqrt weights are decimal-quantized before the
    global normalizing sum, keeping the total order-independent.

    Scale shape: one hash-agg to per-domain counts (tiny), one broadcast of
    the 1-row normalizer — nothing proportional to corpus size shuffles.
    """
    docs = load_table(spark, sf_dir, "documents")
    counts = (
        docs.groupBy("source", "lang")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .withColumn(
            "raw_weight",
            F.sqrt(F.col("n_docs").cast("double")).cast("decimal(28,12)"),
        )
    )
    total = counts.agg(F.sum("raw_weight").alias("_total"))
    return (
        counts.crossJoin(F.broadcast(total))
        .select(
            "source",
            "lang",
            "n_docs",
            (F.col("raw_weight").cast("double") / F.col("_total").cast("double")).alias(
                "mixture_weight"
            ),
        )
        .withColumn(
            "epoch_docs",
            F.floor(F.lit(float(MIXTURE_BUDGET)) * F.col("mixture_weight")).cast("bigint"),
        )
    )


_ORACLE_DOMAIN_MIXTURE = f"""
WITH counts AS (
  SELECT source, lang, COUNT(*) AS n_docs,
         CAST(sqrt(CAST(COUNT(*) AS DOUBLE)) AS DECIMAL(28,12)) AS raw_weight
  FROM documents GROUP BY source, lang
),
total AS (SELECT SUM(raw_weight) AS _total FROM counts)
SELECT source, lang, n_docs,
       CAST(raw_weight AS DOUBLE) / CAST(_total AS DOUBLE) AS mixture_weight,
       CAST(floor({float(MIXTURE_BUDGET)} * (CAST(raw_weight AS DOUBLE) / CAST(_total AS DOUBLE))) AS BIGINT) AS epoch_docs
FROM counts, total
"""


# ---------------------------------------------------------------------------
# Quality-weighted importance sampling
# ---------------------------------------------------------------------------

IMP_FINE = 1_000_000   # hash-uniform resolution (1e-6 probability steps)
IMP_PER_TOKEN = 10_000  # keep-probability slope: P(keep) = min(1, n_tokens/100)


def q_importance_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document weighted Bernoulli sampling with a content-hash
    uniform instead of RNG: keep a document iff
    ``md5(doc_id) % 1e6 < min(1e6, n_tokens·1e4)`` — i.e. keep with
    probability min(1, n_tokens/100), the importance-sampling shape that
    up-weights long documents (swap in any per-row quality weight).

    ``rand() < w`` is the textbook formulation and is NOT reproducible in
    a distributed engine (the draw depends on partition layout and task
    retries); the hash-uniform is the same trick the split/strata
    operators above use, extended from fixed percentages to a PER-ROW
    weight. The acceptance test is pure INTEGER arithmetic (fine-bucket
    vs weight·1e6 — no float compare at the boundary), so the sample is
    identical on every run, engine, and partitioning, and the gate stays
    an exact hash compare. Scale shape: one narrow whole-stage-codegen
    projection (md5 + token count per row, zero joins, zero extra
    shuffles) feeding a per-language agg."""
    docs = load_table(spark, sf_dir, "documents")
    n_tok = F.size(_tokens(F.col("text")))
    fine = (
        F.conv(
            F.substring(F.md5(F.col("doc_id").cast("string")), 1, 15), 16, 10
        ).cast("bigint")
        % IMP_FINE
    )
    keep = fine < F.least(F.lit(IMP_FINE), n_tok.cast("bigint") * F.lit(IMP_PER_TOKEN))
    return (
        docs.select("lang", keep.alias("keep"))
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_total"),
            F.sum(F.col("keep").cast("long")).alias("n_kept"),
        )
        .select(
            "lang",
            "n_total",
            "n_kept",
            (F.col("n_kept").cast("double") / F.col("n_total")).alias("kept_frac"),
        )
    )


_ORACLE_IMPORTANCE_SAMPLE = f"""
SELECT lang, n_total, CAST(n_kept AS BIGINT) AS n_kept,
       CAST(n_kept AS DOUBLE) / n_total AS kept_frac
FROM (
  SELECT lang,
         COUNT(*) AS n_total,
         SUM(CASE WHEN fine < LEAST({IMP_FINE}, n_tok * {IMP_PER_TOKEN})
                  THEN 1 ELSE 0 END) AS n_kept
  FROM (
    SELECT lang,
           ({_sql_hex_to_int('md5(CAST(doc_id AS VARCHAR))', 1, 15)} % {IMP_FINE}) AS fine,
           CAST(len({_sql_tokens("text")}) AS BIGINT) AS n_tok
    FROM documents
  )
  GROUP BY 1
)
"""


# ---------------------------------------------------------------------------
# Deterministic contrastive negative sampling
# ---------------------------------------------------------------------------

NEG_K = 4  # candidate negatives drawn per anchor


def q_negative_sampling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contrastive negative sampling over the customer–supplier interaction
    graph: for every customer (anchor), draw {NEG_K} candidate suppliers by
    RNG-free hashing — candidate_k = md5(custkey ':' k) mod max_suppkey + 1
    — then REJECT candidates the customer actually interacted with (true
    positives) via an anti-join. The (anchor, negative) pairs are the
    training fuel for two-tower / contrastive retrieval models; hashing
    instead of RNG keeps the sample identical across engines, runs, and
    partitionings (the same trick as ``importance_sample``).

    The draw is with-replacement across k (two k's may collide on one
    supplier — kept, as standard uniform negative sampling allows); the
    rejection step makes these *true* negatives, the variant that needs a
    distributed engine at all (uniform sampling alone never touches the
    positives table).

    Scale shape: candidates are a narrow per-row expression over the
    customer table (an explode of {NEG_K} hash exprs — no RNG state, no
    shuffle); the positives side is one distinct projection of the fact
    join; the rejection is ONE anti-join on (custkey, suppkey) — at 100 TB
    AQE picks broadcast (positives-distinct is interaction-sized, often
    small) or shuffled-hash; nothing is ever all-pairs. max_suppkey is a
    one-row agg broadcast by crossJoin."""
    customer = load_table(spark, sf_dir, "customer").select("c_custkey")
    supplier = load_table(spark, sf_dir, "supplier").select("s_suppkey")
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    lineitem = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")

    max_supp = supplier.agg(F.max("s_suppkey").alias("_max_supp"))
    positives = (
        lineitem.join(orders, lineitem["l_orderkey"] == orders["o_orderkey"])
        .select("o_custkey", "l_suppkey")
        .distinct()
    )

    def _draw(k: int) -> F.Column:
        h = F.md5(F.concat_ws(":", F.col("c_custkey").cast("string"), F.lit(str(k))))
        return F.conv(F.substring(h, 1, 15), 16, 10).cast("bigint") % F.col(
            "_max_supp"
        ) + 1

    cands = (
        customer.crossJoin(F.broadcast(max_supp))
        .select(
            "c_custkey",
            F.explode(
                F.array(
                    *[
                        F.struct(F.lit(k).alias("k"), _draw(k).alias("neg_suppkey"))
                        for k in range(NEG_K)
                    ]
                )
            ).alias("d"),
        )
        .select("c_custkey", "d.k", "d.neg_suppkey")
    )
    return cands.join(
        positives,
        (cands["c_custkey"] == positives["o_custkey"])
        & (cands["neg_suppkey"] == positives["l_suppkey"]),
        "left_anti",
    )


def _sql_negative_sampling() -> str:
    draws = " UNION ALL ".join(
        f"""SELECT c_custkey, {k} AS k,
        ({_sql_hex_to_int(f"md5(CAST(c_custkey AS VARCHAR) || ':{k}')", 1, 15)})
          % (SELECT MAX(s_suppkey) FROM supplier) + 1 AS neg_suppkey
        FROM customer"""
        for k in range(NEG_K)
    )
    return f"""
WITH cands AS ({draws}),
positives AS (
  SELECT DISTINCT o_custkey, l_suppkey
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
)
SELECT c.c_custkey, c.k, c.neg_suppkey
FROM cands c
WHERE NOT EXISTS (
  SELECT 1 FROM positives p
  WHERE p.o_custkey = c.c_custkey AND p.l_suppkey = c.neg_suppkey
)
"""


# ---------------------------------------------------------------------------
# Token-budget mixture fill (pretraining-mix materialization)
# ---------------------------------------------------------------------------

# Fraction of the corpus' total tokens the mixture may spend — <1 so the
# head-source cutoff path is actually exercised at every SF.
BUDGET_FRAC = 0.5
TB_BUCKETS = 256  # 2^60-range hash >> 52 -> 256 order-preserving buckets


def q_token_budget_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Materialize a training mixture to a TOKEN budget: give each source a
    target of ``w_s × {BUDGET_FRAC} × Σtokens`` where ``w_s ∝
    sqrt(tokens_s)`` (the α=0.5 temperature mixture — tail sources keep
    everything, the over-represented head is cut), then fill each source's
    budget greedily in deterministic hash order, emitting the selected
    documents with their running token totals. This is the step that turns
    mixture WEIGHTS (``q_domain_mixture``) into an actual document set —
    "sample 1T tokens at these weights" — and hash-order selection makes
    the chosen set a pure function of the corpus, reproducible at any
    partitioning (same property as ``q_stratified_sample``).

    Determinism: sqrt is IEEE correctly-rounded; weights are
    decimal-quantized before the normalizing sum (order-free); targets are
    ``floor`` of one double product; the greedy order is (md5-hash,
    doc_id) — total and engine-independent; the running totals are integer
    sums over that total order.

    Scale shape: token counting is a narrow scan; per-source totals are a
    tiny hash-agg broadcast back. The running totals are a DISTRIBUTED
    PREFIX SUM, not a per-source window: ``source`` is low-cardinality, so
    a window partitioned on it alone would sort each source's entire
    corpus in ONE task (petabytes per task at 100 TB). Instead the hash
    order is range-bucketed (``h >> 52`` → {TB_BUCKETS} ordered buckets —
    h < 2^60, so the shift preserves h order across buckets), per-bucket
    token sums roll up to broadcastable cross-bucket offsets (sources ×
    {TB_BUCKETS} rows), and the per-row cumsum windows over (source,
    bucket) — {TB_BUCKETS}× the parallelism, identical values, same
    single corpus-sized shuffle. No collect, no loop.
    """
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id",
        "source",
        F.size(_tokens(F.col("text"))).alias("n_tok"),
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 15), 16, 10)
        .cast("bigint")
        .alias("h"),
    )
    per_source = tok.groupBy("source").agg(F.sum("n_tok").alias("src_tokens"))
    weighted = per_source.withColumn(
        "raw_weight", F.sqrt(F.col("src_tokens").cast("double")).cast("decimal(28,12)")
    )
    totals = weighted.agg(
        F.sum("src_tokens").alias("_tot_tokens"), F.sum("raw_weight").alias("_tot_w")
    )
    targets = weighted.crossJoin(F.broadcast(totals)).select(
        "source",
        F.floor(
            (F.col("raw_weight").cast("double") / F.col("_tot_w").cast("double"))
            * (F.lit(BUDGET_FRAC) * F.col("_tot_tokens").cast("double"))
        ).alias("target_tokens"),
    )
    tokb = tok.withColumn("bucket", F.shiftright(F.col("h"), 52))
    bucket_offsets = (
        tokb.groupBy("source", "bucket")
        .agg(F.sum("n_tok").alias("_bsum"))
        .withColumn(
            "_offset",
            F.coalesce(
                F.sum("_bsum").over(
                    Window.partitionBy("source")
                    .orderBy("bucket")
                    .rowsBetween(Window.unboundedPreceding, -1)
                ),
                F.lit(0),
            ),
        )
        .select("source", "bucket", "_offset")
    )
    w = Window.partitionBy("source", "bucket").orderBy(
        F.asc("h"), F.asc("doc_id")
    ).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    filled = (
        tokb.join(F.broadcast(targets), "source")
        .join(F.broadcast(bucket_offsets), ["source", "bucket"])
        .withColumn("cum_tokens", F.col("_offset") + F.sum("n_tok").over(w))
        .filter(F.col("cum_tokens") <= F.col("target_tokens"))
    )
    return filled.select("doc_id", "source", "n_tok", "cum_tokens", "target_tokens")


_ORACLE_TOKEN_BUDGET_FILL = f"""
WITH tok AS (
  SELECT doc_id, source,
         CAST(len({_sql_tokens("text")}) AS INTEGER) AS n_tok,
         {_sql_hex_to_int('md5(CAST(doc_id AS VARCHAR))', 1, 15)} AS h
  FROM documents
), per_source AS (
  SELECT source, SUM(n_tok) AS src_tokens,
         CAST(sqrt(CAST(SUM(n_tok) AS DOUBLE)) AS DECIMAL(28,12)) AS raw_weight
  FROM tok GROUP BY source
), totals AS (
  SELECT SUM(src_tokens) AS tot_tokens, SUM(raw_weight) AS tot_w FROM per_source
), targets AS (
  SELECT source,
         CAST(floor((CAST(raw_weight AS DOUBLE) / CAST(tot_w AS DOUBLE))
                    * ({BUDGET_FRAC} * CAST(tot_tokens AS DOUBLE))) AS BIGINT)
           AS target_tokens
  FROM per_source, totals
), filled AS (
  SELECT t.doc_id, t.source, t.n_tok,
         SUM(t.n_tok) OVER (PARTITION BY t.source ORDER BY t.h, t.doc_id
                            ROWS UNBOUNDED PRECEDING) AS cum_tokens,
         g.target_tokens
  FROM tok t JOIN targets g USING (source)
)
SELECT doc_id, source, n_tok, CAST(cum_tokens AS BIGINT) AS cum_tokens, target_tokens
FROM filled WHERE cum_tokens <= target_tokens
"""


# ---------------------------------------------------------------------------
# Training-shard export manifest (webdataset-style shard planning)
# ---------------------------------------------------------------------------

N_SHARDS = 16


def q_shard_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shard-export manifest: assign every curated document to one of
    {N_SHARDS} hash shards (deterministic md5 — reproducible across runs,
    engines, and partitionings) and emit the per-shard manifest a
    training loader consumes: document count, byte/char volume, estimated
    token budget, language spread, and the id range for resumable reads.

    This is the planning half of a webdataset-style export: the manifest
    is computed BEFORE writing shards, so imbalanced shards (hash skew,
    giant documents) surface as numbers rather than as a straggler task
    at write time. One additive aggregation over a narrow projection —
    the scan is the cost; at 100 TB the same plan emits manifests for
    thousands of shards equally well."""
    docs = load_table(spark, sf_dir, "documents")
    shard = (_bucket_col() % N_SHARDS).alias("shard_id")
    return (
        docs.select(shard, "doc_id", "lang", "n_chars")
        .groupBy("shard_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
            F.sum(F.expr("n_chars div 4")).alias("est_tokens"),
            F.countDistinct("lang").alias("n_langs"),
            F.min("doc_id").alias("min_doc_id"),
            F.max("doc_id").alias("max_doc_id"),
        )
        .orderBy("shard_id")
    )


_ORACLE_SHARD_MANIFEST = f"""
SELECT {_sql_bucket()} % {N_SHARDS} AS shard_id,
       COUNT(*) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS total_chars,
       CAST(SUM(n_chars // 4) AS BIGINT) AS est_tokens,
       COUNT(DISTINCT lang) AS n_langs,
       MIN(doc_id) AS min_doc_id,
       MAX(doc_id) AS max_doc_id
FROM documents
GROUP BY 1
ORDER BY shard_id
"""


# ---------------------------------------------------------------------------
# Systematic (every k-th) sampling
# ---------------------------------------------------------------------------

SYST_K = 50       # keep 1-in-50 documents
SYST_OFFSET = 37  # fixed start offset (deterministic; a production run
                  # would derive it from a seeded hash, same mechanics)


def q_sample_systematic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Systematic 1-in-{k} sampling of the documents table in doc_id
    order: keep rows whose rank ≡ {o} (mod {k}) — the third classical
    sampling discipline next to ``stratified_sample`` and
    ``importance_sample``. Systematic sampling gives implicit
    stratification over the sort key (eval sets that track corpus drift
    over ingest order) with a single pass and ZERO randomness to audit.

    Determinism: rank is ROW_NUMBER over the unique doc_id — fully
    ordered, no tie ambiguity — and selection is an exact integer
    congruence. Scale shape: the ``_cum_prev`` bucketed rank (r14
    optimization — range-partitioned ranking, no single-task sort; the
    plain ROW_NUMBER oracle proves value-identity). Output is |docs|/{k}
    rows — sample-sized, tiny.
    """
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "source", "n_chars"
    )
    return (
        _cum_prev(docs, ["doc_id"], {"_rp": F.lit(1)})
        .filter((F.col("_rp") + F.lit(1)) % SYST_K == SYST_OFFSET)
        .select("doc_id", "lang", "source", "n_chars")
        .orderBy("doc_id")
    )
q_sample_systematic.__doc__ = q_sample_systematic.__doc__ and q_sample_systematic.__doc__.format(k=SYST_K, o=SYST_OFFSET)


_ORACLE_SYSTEMATIC = f"""
SELECT doc_id, lang, source, n_chars
FROM (
  SELECT doc_id, lang, source, n_chars,
         ROW_NUMBER() OVER (ORDER BY doc_id) AS rn
  FROM documents
)
WHERE rn % {SYST_K} = {SYST_OFFSET}
ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# Cross-source quantile normalization (round 10)
# ---------------------------------------------------------------------------

QNORM_DECILES = 10


def q_quantile_normalize_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-source quantile normalization of the document length signal:
    map every source's decile values onto the POOLED corpus deciles — the
    batch-effect correction that makes per-source quality scores
    comparable before a global threshold cut (each crawl/source has its
    own length/quality distribution; filtering them with one raw
    threshold over- or under-prunes whole sources; rank-based mapping is
    the genomics/curation standard fix). Deciles are TYPE-1 exact order
    statistics picked at the integer index ⌈d·n/10⌉ = (d·n + 9) div 10
    from the per-VALUE cumulative-count decomposition (group by value →
    running count → first value whose cumulative count reaches the
    target) — no per-row global sort, no float quantile interpolation.

    Scale shape: two hash aggs to the per-(source, value) and per-value
    grouped tables (value domains are bounded, ~thousands of distinct
    lengths however big the corpus), keyed/domain-sized windows for the
    running counts, and a decile-spine join — every data-sized stage is
    an aggregation."""
    docs = load_table(spark, sf_dir, "documents").select("source", "n_chars")
    by_sv = docs.groupBy("source", "n_chars").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    cum_s = _cum_prev(
        by_sv,
        ["n_chars"],
        {"_cp": F.col("c")},
        group_cols=["source"],
        materialize=True,
    ).withColumn("cum", F.col("_cp") + F.col("c"))
    n_s = by_sv.groupBy("source").agg(F.sum("c").cast("long").alias("n"))
    deciles = spark.range(1, QNORM_DECILES + 1).select(
        F.col("id").cast("int").alias("decile")
    )
    tgt_s = n_s.crossJoin(F.broadcast(deciles)).select(
        "source",
        "decile",
        F.expr(f"(decile * n + {QNORM_DECILES - 1}) div {QNORM_DECILES}").alias(
            "tgt"
        ),
    )
    src_q = (
        cum_s.join(tgt_s, "source")
        .filter(F.col("cum") >= F.col("tgt"))
        .groupBy("source", "decile")
        .agg(F.min("n_chars").cast("long").alias("source_value"))
    )
    by_v = docs.groupBy("n_chars").agg(F.count(F.lit(1)).cast("long").alias("c"))
    cum_p = _cum_prev(by_v, ["n_chars"], {"_cq": F.col("c")}, materialize=True).withColumn(
        "cum", F.col("_cq") + F.col("c")
    )
    n_p = docs.agg(F.count(F.lit(1)).cast("long").alias("n"))
    tgt_p = n_p.crossJoin(F.broadcast(deciles)).select(
        "decile",
        F.expr(f"(decile * n + {QNORM_DECILES - 1}) div {QNORM_DECILES}").alias(
            "tgt"
        ),
    )
    pool_q = (
        cum_p.crossJoin(F.broadcast(tgt_p))
        .filter(F.col("cum") >= F.col("tgt"))
        .groupBy("decile")
        .agg(F.min("n_chars").cast("long").alias("pooled_value"))
    )
    return (
        src_q.join(F.broadcast(pool_q), "decile")
        .select("source", "decile", "source_value", "pooled_value")
        .orderBy("source", "decile")
    )


_ORACLE_QNORM = f"""
WITH by_sv AS (
  SELECT source, n_chars, CAST(COUNT(*) AS BIGINT) AS c
  FROM documents GROUP BY 1, 2
), cum_s AS (
  SELECT source, n_chars, c,
         SUM(c) OVER (PARTITION BY source ORDER BY n_chars) AS cum
  FROM by_sv
), n_s AS (
  SELECT source, CAST(SUM(c) AS BIGINT) AS n FROM by_sv GROUP BY 1
), deciles AS (
  SELECT CAST(UNNEST(range(1, {QNORM_DECILES + 1})) AS INT) AS decile
), tgt_s AS (
  SELECT source, decile, (decile * n + {QNORM_DECILES - 1}) // {QNORM_DECILES} AS tgt
  FROM n_s CROSS JOIN deciles
), src_q AS (
  SELECT c.source, t.decile, CAST(MIN(c.n_chars) AS BIGINT) AS source_value
  FROM cum_s c JOIN tgt_s t ON c.source = t.source AND c.cum >= t.tgt
  GROUP BY 1, 2
), by_v AS (
  SELECT n_chars, CAST(COUNT(*) AS BIGINT) AS c FROM documents GROUP BY 1
), cum_p AS (
  SELECT n_chars, SUM(c) OVER (ORDER BY n_chars) AS cum FROM by_v
), tgt_p AS (
  SELECT decile,
         (decile * (SELECT COUNT(*) FROM documents) + {QNORM_DECILES - 1})
           // {QNORM_DECILES} AS tgt
  FROM deciles
), pool_q AS (
  SELECT t.decile, CAST(MIN(p.n_chars) AS BIGINT) AS pooled_value
  FROM cum_p p CROSS JOIN tgt_p t
  WHERE p.cum >= t.tgt
  GROUP BY 1
)
SELECT s.source, s.decile, s.source_value, q.pooled_value
FROM src_q s JOIN pool_q q USING (decile)
ORDER BY s.source, s.decile
"""


# ---------------------------------------------------------------------------
# Neyman optimal allocation (round 10 wave 6)
# ---------------------------------------------------------------------------

NEYMAN_BUDGET = 10_000  # total sample budget n (literal design parameter)
_NEY_UNIT = 1.0e9  # $10M units (house unit discipline)


def q_neyman_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Neyman optimal allocation of a {n}-row sample budget across the
    five order-priority strata: n_h ∝ N_h·S_h — the survey-sampling
    design that minimizes the variance of the estimated total for a
    fixed budget (proportional allocation ignores S_h and over-samples
    homogeneous strata). The readout every large-scale data-quality
    audit needs before it samples: WHERE to spend the labeling budget.
    Ships both allocations per stratum plus the variance ratio
    Var_prop/Var_neyman = N·ΣN_hS_h² · (ΣN_hS_h)⁻²·... (the design
    effect of ignoring stratum heterogeneity — >1 means Neyman wins).

    Exactness: stratum means are exact rationals from integer cent
    sums; S_h sums squares of deviations CENTERED on them (fsum scale
    12, the module-wide cancellation rule); every shipped float is one
    IEEE sequence. Scale shape: two map-side-combinable hash aggs (one
    for moments, one broadcast re-pass for centered squares) — both
    ≤|strata| rows after."""
    from us_flight_bigdata_dashboard_spark.functions.exact import fsum

    orders = load_table(spark, sf_dir, "orders")
    cents = F.round(F.col("o_totalprice") * 100, 0).cast("bigint")
    base = orders.select(
        F.col("o_orderpriority").alias("stratum"), cents.alias("cents")
    )
    m = base.groupBy("stratum").agg(
        F.count(F.lit(1)).cast("long").alias("n_h"),
        F.sum("cents").cast("long").alias("t_h"),
    )
    x = F.col("cents").cast("double") / F.lit(_NEY_UNIT)
    mean_h = F.col("t_h").cast("double") / F.col("n_h").cast("double") / F.lit(
        _NEY_UNIT
    )
    dev = x - mean_h
    ss = (
        base.join(F.broadcast(m), "stratum")
        .groupBy("stratum")
        .agg(
            F.max("n_h").alias("n_h"),
            fsum(dev * dev, scale=12).alias("ss_h"),
        )
    )
    nd = F.col("n_h").cast("double")
    s_h = F.sqrt(F.col("ss_h") / (nd - F.lit(1.0)))
    scored = ss.select("stratum", "n_h", s_h.alias("s_h"), (nd * s_h).alias("w_h"))
    tot = scored.agg(
        F.sum("n_h").cast("long").alias("n_pop"),
        fsum(F.col("w_h"), scale=6).alias("sw"),
        fsum(F.col("w_h") * F.col("s_h"), scale=6).alias("sws"),
    )
    out = scored.crossJoin(F.broadcast(tot))
    budget = F.lit(float(NEYMAN_BUDGET))
    neyman = budget * F.col("w_h") / F.col("sw")
    prop = budget * F.col("n_h").cast("double") / F.col("n_pop").cast("double")
    # Var_prop / Var_neyman for the stratified mean estimator (fpc-free):
    #   Var_prop ∝ (1/n)·Σ(N_h/N)S_h²;  Var_ney ∝ (1/n)·(Σ(N_h/N)S_h)²
    deff = (
        F.col("sws") / F.col("n_pop").cast("double")
    ) / (
        (F.col("sw") / F.col("n_pop").cast("double"))
        * (F.col("sw") / F.col("n_pop").cast("double"))
    )
    return out.select(
        "stratum",
        "n_h",
        (F.col("s_h") * F.lit(_NEY_UNIT / 100.0)).alias("stratum_sd_dollars"),
        neyman.alias("neyman_n"),
        prop.alias("proportional_n"),
        deff.alias("variance_ratio_prop_vs_neyman"),
    ).orderBy("stratum")
q_neyman_allocation.__doc__ = q_neyman_allocation.__doc__ and q_neyman_allocation.__doc__.format(n=NEYMAN_BUDGET)


def _sql_neyman() -> str:
    from us_flight_bigdata_dashboard_spark.functions.exact import sql_fsum

    x = "(CAST(cents AS DOUBLE) / 1000000000.0)"
    mean_h = "(CAST(t_h AS DOUBLE) / CAST(n_h AS DOUBLE) / 1000000000.0)"
    dev = f"({x} - {mean_h})"
    return f"""
WITH base AS (
  SELECT o_orderpriority AS stratum,
         CAST(round(o_totalprice * 100, 0) AS BIGINT) AS cents
  FROM orders
), m AS (
  SELECT stratum, CAST(COUNT(*) AS BIGINT) AS n_h,
         CAST(SUM(cents) AS BIGINT) AS t_h
  FROM base GROUP BY 1
), ss AS (
  SELECT stratum, MAX(n_h) AS n_h,
         {sql_fsum(f"{dev} * {dev}", scale=12)} AS ss_h
  FROM base JOIN m USING (stratum)
  GROUP BY stratum
), scored AS (
  SELECT stratum, n_h,
         sqrt(ss_h / (CAST(n_h AS DOUBLE) - 1.0)) AS s_h,
         CAST(n_h AS DOUBLE) * sqrt(ss_h / (CAST(n_h AS DOUBLE) - 1.0)) AS w_h
  FROM ss
), tot AS (
  SELECT CAST(SUM(n_h) AS BIGINT) AS n_pop,
         {sql_fsum("w_h", scale=6)} AS sw,
         {sql_fsum("w_h * s_h", scale=6)} AS sws
  FROM scored
)
SELECT stratum, n_h,
       s_h * 10000000.0 AS stratum_sd_dollars,
       {float(NEYMAN_BUDGET)!r} * w_h / sw AS neyman_n,
       {float(NEYMAN_BUDGET)!r} * CAST(n_h AS DOUBLE) / CAST(n_pop AS DOUBLE)
         AS proportional_n,
       (sws / CAST(n_pop AS DOUBLE))
         / ((sw / CAST(n_pop AS DOUBLE)) * (sw / CAST(n_pop AS DOUBLE)))
         AS variance_ratio_prop_vs_neyman
FROM scored CROSS JOIN tot
ORDER BY stratum
"""


# ---------------------------------------------------------------------------
# Horvitz-Thompson unequal-probability estimate (round 10 wave 13)
# ---------------------------------------------------------------------------

HT_EXPECTED_N = 200  # expected sample size (sets the inclusion scale)
_HT_HASH_FULL = 1 << 48  # 12 hex digits of md5 → uniform u48


def q_horvitz_thompson(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Horvitz-Thompson total estimator under size-proportional sampling:
    include document i with probability π_i ∝ n_chars (capped at 1),
    estimate the corpus TOKEN total as Σ_sampled y_i/π_i, and ship it
    beside the exact total — PPS sampling + HT is how every serious
    data-quality audit prices a corpus property from a budgeted sample
    (big documents carry more of the total, so they deserve more of the
    budget; uniform sampling wastes it — the unequal-π companion of
    ``neyman_allocation``'s stratified answer). The inclusion coin is
    the portable md5-u48 (module convention) — deterministic, so the
    realized sample and estimate are reproducible on both engines; the
    driver gate checks THIS realization, pytest checks the estimator's
    accuracy bound.

    Exactness: π_i = least(1, c·n_chars) with c = {n}/Σchars is one
    IEEE sequence on exact integers; the inclusion compare is integer
    hash < π·2⁴⁸ (floor-quantized to integer — identical both ways);
    the HT sum is a floor-quantized fsum (scale 8 — the scale-4 quantum measurably cost 4e-7 relative). Scale shape: one exact agg
    (Σchars), one broadcast re-pass with the hash filter, one sum —
    all map-side combinable."""
    from us_flight_bigdata_dashboard_spark.functions.exact import fsum

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "n_chars", F.size(_tokens(F.col("text"))).alias("y")
    )
    tot = docs.agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("n_chars").cast("long").alias("sum_chars"),
        F.sum("y").cast("long").alias("true_total"),
    )
    h = F.conv(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 12), 16, 10
    ).cast("bigint")
    joined = docs.crossJoin(F.broadcast(tot))
    pi = F.least(
        F.lit(1.0),
        F.lit(float(HT_EXPECTED_N))
        * F.col("n_chars").cast("double")
        / F.col("sum_chars").cast("double"),
    )
    # integer threshold: hash < floor(pi * 2^48) — identical on both engines
    thresh = F.floor(pi * F.lit(float(_HT_HASH_FULL))).cast("bigint")
    sampled = joined.withColumn("h", h).filter(F.col("h") < thresh)
    est = sampled.agg(
        F.count(F.lit(1)).cast("long").alias("n_sampled"),
        F.max("true_total").alias("true_total"),
        fsum(
            F.col("y").cast("double")
            / F.least(
                F.lit(1.0),
                F.lit(float(HT_EXPECTED_N))
                * F.col("n_chars").cast("double")
                / F.col("sum_chars").cast("double"),
            ),
            scale=8,
        ).alias("ht_estimate"),
    )
    err = (F.col("ht_estimate") - F.col("true_total").cast("double")) / F.col(
        "true_total"
    ).cast("double")
    return est.select(
        "n_sampled",
        F.col("ht_estimate").alias("ht_token_total"),
        F.col("true_total").alias("true_token_total"),
        (err * F.lit(100.0)).alias("rel_err_pct"),
    )
q_horvitz_thompson.__doc__ = q_horvitz_thompson.__doc__ and q_horvitz_thompson.__doc__.format(n=HT_EXPECTED_N)


def _sql_horvitz_thompson() -> str:
    from us_flight_bigdata_dashboard_spark.functions.exact import sql_fsum

    hx = _sql_hex_to_int("md5(CAST(doc_id AS VARCHAR))", 1, 12)
    pi = (
        f"LEAST(1.0, {float(HT_EXPECTED_N)!r} * CAST(n_chars AS DOUBLE)"
        f" / CAST(sum_chars AS DOUBLE))"
    )
    return f"""
WITH docs AS (
  SELECT doc_id, n_chars,
         CAST(len({_sql_tokens("text")}) AS INTEGER) AS y
  FROM documents
), tot AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
         CAST(SUM(y) AS BIGINT) AS true_total
  FROM docs
), sampled AS (
  SELECT doc_id, n_chars, y, sum_chars, true_total
  FROM docs CROSS JOIN tot
  WHERE {hx} < CAST(floor({pi} * {float(_HT_HASH_FULL)!r}) AS BIGINT)
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_sampled,
       {sql_fsum(f"CAST(y AS DOUBLE) / {pi}", scale=8)} AS ht_token_total,
       MAX(true_total) AS true_token_total,
       ({sql_fsum(f"CAST(y AS DOUBLE) / {pi}", scale=8)}
        - CAST(MAX(true_total) AS DOUBLE)) / CAST(MAX(true_total) AS DOUBLE)
         * 100.0 AS rel_err_pct
FROM sampled
"""


# ---------------------------------------------------------------------------
# PPS systematic sampling (round 12)
# ---------------------------------------------------------------------------

PPS_N = 40  # draws — literal, so the sample stays audit-sized at every SF


def q_pps_systematic_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Systematic PROBABILITY-PROPORTIONAL-TO-SIZE sampling of documents
    with size = n_chars, {n} draws — the survey-sampling workhorse for
    byte-budgeted corpus audits (big documents matter more, so they
    must be drawn more often; equal-probability sampling under-covers
    exactly the rows that dominate the byte mass). Completes the design
    ladder: ``sample_systematic`` (equal-prob), ``stratified_sample`` /
    ``neyman_allocation`` (between-stratum), ``importance_sample``
    (weight-corrected), ``horvitz_thompson`` (the estimator this design
    feeds).

    ZERO-RNG exact integer selection: with cumulative sizes C_i over
    doc_id order, total T, and the standard half-step offset, draw k
    (k = 0..{n}−1) falls at threshold (2k+1)·T/(2·{n}); unit i absorbs
    it iff 2{n}·C_(i−1) ≤ (2k+1)·T < 2{n}·C_i. The HIT COUNT telescopes
    through f(x) = ((2{n}x − 1) div T + 1) div 2 — hits_i = f(C_i) −
    f(C_(i−1)) — pure integer division on both engines (a unit larger
    than the step is hit multiple times, the correct PPS-systematic
    multiplicity). Σ hits = {n} by construction. The reported
    ht_weight = T/({n}·size_i) is the Horvitz-Thompson inverse
    inclusion weight (valid as 1/π_i while size < step), ONE IEEE
    division of exact integers.

    Scale shape: the ``_cum_prev`` bucketed cumulative over doc_id (r14
    optimization — no single-task window) + a broadcast 1-row total;
    output is ≤{n} rows.

    Reference analog: none (engine addition, SURVEY.md §2.7)."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "n_chars")
    cum = _cum_prev(docs, ["doc_id"], {"_cp": F.col("n_chars")}).select(
        "doc_id",
        "n_chars",
        (F.col("_cp") + F.col("n_chars")).cast("long").alias("c_hi"),
    ).select(
        "doc_id",
        "n_chars",
        "c_hi",
        (F.col("c_hi") - F.col("n_chars")).alias("c_lo"),
    )
    tot = cum.agg(F.max("c_hi").cast("long").alias("t"))
    n2 = 2 * PPS_N
    hits = cum.crossJoin(F.broadcast(tot)).select(
        "doc_id",
        "n_chars",
        "t",
        (
            F.expr(f"(({n2} * c_hi - 1) div t + 1) div 2")
            - F.expr(f"CASE WHEN c_lo > 0 THEN (({n2} * c_lo - 1) div t + 1) div 2 ELSE 0 END")
        )
        .cast("long")
        .alias("n_hits"),
    )
    return (
        hits.filter(F.col("n_hits") >= 1)
        .select(
            "doc_id",
            "n_chars",
            "n_hits",
            (
                F.col("t").cast("double")
                / (F.lit(float(PPS_N)) * F.col("n_chars").cast("double"))
            ).alias("ht_weight"),
        )
        .orderBy("doc_id")
    )
q_pps_systematic_sample.__doc__ = q_pps_systematic_sample.__doc__ and q_pps_systematic_sample.__doc__.format(
        n=PPS_N
    )


_ORACLE_PPS_SYSTEMATIC = f"""
WITH cum AS (
  SELECT doc_id, n_chars,
         CAST(SUM(n_chars) OVER (ORDER BY doc_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS c_hi
  FROM documents
), tot AS (SELECT CAST(MAX(c_hi) AS BIGINT) AS t FROM cum),
hits AS (
  SELECT doc_id, n_chars, t,
         ((({2 * PPS_N} * c_hi - 1) // t + 1) // 2)
           - (CASE WHEN c_hi - n_chars > 0
                   THEN (({2 * PPS_N} * (c_hi - n_chars) - 1) // t + 1) // 2
                   ELSE 0 END) AS n_hits
  FROM cum CROSS JOIN tot
)
SELECT doc_id, n_chars, CAST(n_hits AS BIGINT) AS n_hits,
       CAST(t AS DOUBLE) / ({float(PPS_N)} * CAST(n_chars AS DOUBLE)) AS ht_weight
FROM hits WHERE n_hits >= 1
ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# Balanced repeated replication (BRR) variance (round 13 late)
# ---------------------------------------------------------------------------

BRR_STRATA = 8  # literal stratum count — one 8x8 Sylvester-Hadamard matrix


def _hadamard8() -> list[list[int]]:
    h = [[1]]
    while len(h) < BRR_STRATA:
        h = [r + r for r in h] + [r + [-x for x in r] for r in h]
    return h


def _brr_tree() -> dict[str, object]:
    """The 8 replicate ratio estimates and the BRR variance as ONE
    shared expression text over the 32 pivoted cell columns u{h}_{p} /
    n{h}_{p} (urgent / total counts of stratum h, PSU p): replicate r
    keeps PSU 0 where the Hadamard sign is +1 and PSU 1 where it is −1
    (half-sample weights cancel in the ratio), and
    Var = (1/R)·Σᵣ(θᵣ − θ)² is a fixed 8-term chain."""
    had = _hadamard8()
    reps = []
    for r in range(BRR_STRATA):
        num = " + ".join(
            f"u{h}_{0 if had[r][h] == 1 else 1}" for h in range(BRR_STRATA)
        )
        den = " + ".join(
            f"n{h}_{0 if had[r][h] == 1 else 1}" for h in range(BRR_STRATA)
        )
        reps.append(f"(CAST({num} AS DOUBLE) / CAST({den} AS DOUBLE))")
    tot_u = " + ".join(f"u{h}_0 + u{h}_1" for h in range(BRR_STRATA))
    tot_n = " + ".join(f"n{h}_0 + n{h}_1" for h in range(BRR_STRATA))
    theta = f"(CAST({tot_u} AS DOUBLE) / CAST({tot_n} AS DOUBLE))"
    var = (
        "(("
        + " + ".join(f"(({rr}) - theta) * (({rr}) - theta)" for rr in reps)
        + f") / {float(BRR_STRATA)!r})"
    )
    return {"theta": theta, "var": var, "tot_n": tot_n}


def q_brr_variance_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Balanced repeated replication (BRR) variance of the urgent-order
    share under a stratified two-PSU design: customers hash into 8
    strata × 2 PSUs (the RNG-free md5 split), and the 8 half-sample
    replicates selected by the rows of the 8×8 Sylvester-Hadamard
    matrix give Var(θ̂) = (1/R)·Σᵣ(θᵣ − θ̂)² — McCarthy's (1969)
    design-based variance machinery (the Fay/BRR default of national
    survey systems), complementing ``jackknife_ratio`` (delete-one
    replicates) with the BALANCED half-sample family: full orthogonal
    balance in R = 8 replicates instead of |groups| deletions.

    Exactness: the 32 (stratum, PSU) cells are ONE conditional hash
    agg of exact integer counts; every replicate ratio θᵣ and the full
    θ̂ are single IEEE divisions of exact-integer sums (half-sample
    weights cancel in a ratio estimator — no weight column ever
    materializes); the variance is a fixed 8-term chain over a SINGLE
    shared expression text (F.expr + oracle — identical IEEE tree).
    Degenerate contract: an empty replicate denominator cannot occur
    while every stratum-PSU cell is non-empty (asserted by the gate
    data); an all-empty frame yields NULLs via the n > 0 guard.

    Scale shape: one fact⋈dim join, one 32-cell conditional hash agg,
    1-row literal-domain arithmetic.

    Reference analog: none (engine addition, SURVEY.md §2.7)."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderpriority"
    )
    h16 = (
        F.conv(
            F.substring(F.md5(F.col("o_custkey").cast("string")), 1, 12), 16, 10
        ).cast("long")
        % (2 * BRR_STRATA)
    )
    based = orders.select(
        (h16 / F.lit(2)).cast("int").alias("stratum"),
        (h16 % 2).cast("int").alias("psu"),
        F.when(F.col("o_orderpriority") == "1-URGENT", F.lit(1))
        .otherwise(F.lit(0))
        .alias("y"),
    )
    aggs = []
    for h in range(BRR_STRATA):
        for p in (0, 1):
            cell = (F.col("stratum") == h) & (F.col("psu") == p)
            aggs.append(
                F.sum(F.when(cell, F.col("y")).otherwise(0))
                .cast("long")
                .alias(f"u{h}_{p}")
            )
            aggs.append(
                F.sum(F.when(cell, 1).otherwise(0)).cast("long").alias(f"n{h}_{p}")
            )
    red = based.agg(*aggs)
    t = _brr_tree()
    staged = red.withColumn("theta", F.expr(t["theta"]))
    n_tot = F.expr(f"CAST({t['tot_n']} AS BIGINT)")
    ok = n_tot > 0
    return staged.select(
        n_tot.alias("n_orders"),
        F.lit(BRR_STRATA).cast("int").alias("n_replicates"),
        F.when(ok, F.col("theta")).alias("theta_urgent_share"),
        F.when(ok, F.sqrt(F.expr(t["var"]))).alias("se_brr"),
    )


def _sql_brr() -> str:
    t = _brr_tree()
    cells = []
    for h in range(BRR_STRATA):
        for p in (0, 1):
            cond = f"stratum = {h} AND psu = {p}"
            cells.append(
                f"CAST(SUM(CASE WHEN {cond} THEN y ELSE 0 END) AS BIGINT) AS u{h}_{p}"
            )
            cells.append(
                f"CAST(SUM(CASE WHEN {cond} THEN 1 ELSE 0 END) AS BIGINT) AS n{h}_{p}"
            )
    cols = ",\n         ".join(cells)
    h16 = _sql_hex_to_int("md5(CAST(o_custkey AS VARCHAR))", 1, 12)
    return f"""
WITH based AS (
  SELECT CAST(({h16} % {2 * BRR_STRATA}) // 2 AS INT) AS stratum,
         CAST(({h16} % {2 * BRR_STRATA}) % 2 AS INT) AS psu,
         CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END AS y
  FROM orders
), red AS (
  SELECT {cols}
  FROM based
), staged AS (
  SELECT *, {t['theta']} AS theta FROM red
)
SELECT CAST({t['tot_n']} AS BIGINT) AS n_orders,
       CAST({BRR_STRATA} AS INT) AS n_replicates,
       CASE WHEN {t['tot_n']} > 0 THEN theta END AS theta_urgent_share,
       CASE WHEN {t['tot_n']} > 0 THEN sqrt({t['var']}) END AS se_brr
FROM staged
"""


# ---------------------------------------------------------------------------
# Sequential Poisson (order) PPS sampling (round 13)
# ---------------------------------------------------------------------------

SPS_N = 40  # draws — literal, so the sample stays audit-sized at every SF
_SPS_BUCKETS = 64  # tournament fan-in for the distributed bottom-n


def q_pps_sequential_poisson(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequential Poisson (order) PPS sampling of documents, size =
    n_chars, 40 draws — Ohlsson's (1998) order-sampling design, the
    fixed-size πps method national statistics offices standardized on
    (Statistics Sweden's surveys run exactly this): each unit gets the
    order variable ξᵢ = uᵢ/xᵢ with uᵢ uniform and xᵢ the size, and the
    sample is the n SMALLEST ξ. Complements ``pps_systematic_sample``
    (list-order systematic): sequential Poisson is list-order-FREE and
    without-replacement by construction (no multiplicities).

    ZERO-RNG determinism: uᵢ is the 48-bit md5 integer of doc_id (the
    module's standard portable hash-uniform); ξᵢ = uᵢ/xᵢ is ONE IEEE
    division of two exact integers (< 2^53 — identical doubles on both
    engines), with the deterministic total order (ξ, u, doc_id). The
    bottom-n is the TOURNAMENT selection (64 hash buckets → per-bucket
    bottom-n window → one ≤64·n-row final pass), not a single-task
    global sort; the oracle's plain ROW_NUMBER proves it value-
    identical. The first-order weight is the standard sequential-
    Poisson approximation wᵢ = max(1, T/(n·xᵢ)) = 1/min(1, n·xᵢ/T),
    with the cap decided by the EXACT integer cross-multiplication
    n·xᵢ ≥ T (no float in the branch).

    Scale shape: one scan computing (u, ξ), one 64-way bucketed window,
    one ≤2,560-row final window, one broadcast scalar total; output is
    exactly n rows.

    Reference analog: none (engine addition, SURVEY.md §2.7)."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "n_chars")
    u = F.conv(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 12), 16, 10
    ).cast("long")
    keyed = docs.filter(F.col("n_chars") > 0).select(
        "doc_id",
        "n_chars",
        u.alias("u"),
        (u.cast("double") / F.col("n_chars").cast("double")).alias("xi"),
    )
    tot = keyed.agg(F.sum("n_chars").cast("long").alias("t"))
    w_bucket = Window.partitionBy("_b").orderBy("xi", "u", "doc_id")
    survivors = (
        keyed.withColumn("_b", F.pmod(F.col("doc_id"), F.lit(_SPS_BUCKETS)))
        .withColumn("_rk", F.row_number().over(w_bucket))
        .filter(F.col("_rk") <= SPS_N)
        .drop("_rk", "_b")
    )
    w_final = Window.orderBy("xi", "u", "doc_id")
    picked = (
        survivors.withColumn("rank", F.row_number().over(w_final))
        .filter(F.col("rank") <= SPS_N)
        .crossJoin(F.broadcast(tot))
    )
    capped = F.col("n_chars").cast("decimal(38,0)") * F.lit(SPS_N) >= F.col(
        "t"
    ).cast("decimal(38,0)")
    return picked.select(
        F.col("rank").cast("int").alias("rank"),
        "doc_id",
        "n_chars",
        "xi",
        F.when(capped, F.lit(1.0))
        .otherwise(
            F.col("t").cast("double")
            / (F.lit(float(SPS_N)) * F.col("n_chars").cast("double"))
        )
        .alias("sps_weight"),
    ).orderBy("rank")


_ORACLE_SPS = f"""
WITH keyed AS (
  SELECT doc_id, n_chars,
         {_sql_hex_to_int("md5(CAST(doc_id AS VARCHAR))", 1, 12)} AS u,
         CAST({_sql_hex_to_int("md5(CAST(doc_id AS VARCHAR))", 1, 12)} AS DOUBLE)
           / CAST(n_chars AS DOUBLE) AS xi
  FROM documents WHERE n_chars > 0
), tot AS (SELECT CAST(SUM(n_chars) AS BIGINT) AS t FROM keyed),
picked AS (
  SELECT ROW_NUMBER() OVER (ORDER BY xi, u, doc_id) AS rank,
         doc_id, n_chars, xi
  FROM keyed
)
SELECT CAST(rank AS INT) AS rank, doc_id, n_chars, xi,
       CASE WHEN CAST(n_chars AS DECIMAL(38,0)) * {SPS_N} >= CAST(t AS DECIMAL(38,0))
            THEN 1.0
            ELSE CAST(t AS DOUBLE) / ({float(SPS_N)!r} * CAST(n_chars AS DOUBLE))
       END AS sps_weight
FROM picked CROSS JOIN tot
WHERE rank <= {SPS_N}
ORDER BY rank
"""


# ---------------------------------------------------------------------------
# Cluster-sample design effect (round 14)
# ---------------------------------------------------------------------------


def q_survey_design_effect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Design effect of a one-stage CLUSTER sample: treating each nation
    as a sampled cluster of customers' orders, how much variance does
    clustering the urgent-order share cost versus simple random
    sampling? deff = 1 + (m₀ − 1)·ρ with ρ the ANOVA intraclass
    correlation ((MSB − MSW)/(MSB + (m₀ − 1)·MSW)) and m₀ the
    size-corrected mean cluster size (n − Σmᵢ²/n)/(k − 1) (Kish 1965) —
    the number that converts every CI this repo emits to its
    cluster-design-honest width, and the planning input
    ``neyman_allocation``/``ab_power_sample_size`` consume as an
    effective-sample-size deflator (n_eff = n/deff).

    Exactness: per-cluster (mᵢ, Σy) are ONE exact-integer hash agg off
    the fact⋈dim join (y binary ⇒ Σy² = Σy — no second moment pass);
    SSB/SSW come from the standard identities on exact sums (Σy²/mᵢ
    terms floor-quantized at scale 8 across the 25-row cluster frame);
    every derived quantity is a fixed IEEE sequence. Degenerate
    contract: k < 2 clusters or a zero MSW+MSB → ρ/deff NULL.

    Scale shape: one fact⋈broadcast-dim join, one |clusters| hash agg,
    25-row algebra.

    Reference analog: none (engine addition, SURVEY.md §2.7)."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey",
        F.when(F.col("o_orderpriority") == "1-URGENT", F.lit(1))
        .otherwise(F.lit(0))
        .alias("y"),
    )
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    per_c = (
        orders.join(F.broadcast(cust), orders["o_custkey"] == cust["c_custkey"])
        .groupBy(F.col("c_nationkey").alias("cluster"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("m_i"),
            F.sum("y").cast("long").alias("s_i"),
        )
    )
    red = per_c.agg(
        F.count(F.lit(1)).cast("long").alias("k"),
        F.sum("m_i").cast("long").alias("n"),
        F.sum("s_i").cast("long").alias("s"),
        F.sum((F.col("m_i") * F.col("m_i")).cast("decimal(38,0)"))
        .cast("decimal(38,0)")
        .alias("m2"),
        fsum(
            F.col("s_i").cast("double")
            * F.col("s_i").cast("double")
            / F.col("m_i").cast("double"),
            scale=8,
        ).alias("ssb_raw"),
    )
    nd = F.col("n").cast("double")
    kd = F.col("k").cast("double")
    sd = F.col("s").cast("double")
    # y is 0/1: SST = s - s²/n ; SSB = Σ sᵢ²/mᵢ - s²/n ; SSW = SST - SSB
    ssb = F.col("ssb_raw") - sd * sd / nd
    ssw = sd - F.col("ssb_raw")
    msb = ssb / (kd - F.lit(1.0))
    msw = ssw / (nd - kd)
    m0 = (nd - dec_to_double(F.col("m2")) / nd) / (kd - F.lit(1.0))
    icc_den = msb + (m0 - F.lit(1.0)) * msw
    icc = (msb - msw) / icc_den
    ok = (F.col("k") >= 2) & (icc_den != 0)
    return red.select(
        F.col("n").alias("n_orders"),
        F.col("k").alias("k_clusters"),
        (sd / nd).alias("p_urgent"),
        m0.alias("m0_mean_cluster_size"),
        F.when(ok, icc).alias("icc_anova"),
        F.when(ok, F.lit(1.0) + (m0 - F.lit(1.0)) * icc).alias("deff"),
    )


def _sql_survey_deff() -> str:
    return f"""
WITH per_c AS (
  SELECT c_nationkey AS cluster,
         CAST(COUNT(*) AS BIGINT) AS m_i,
         CAST(SUM(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END) AS BIGINT) AS s_i
  FROM orders JOIN customer ON o_custkey = c_custkey
  GROUP BY 1
), red AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS k,
         CAST(SUM(m_i) AS BIGINT) AS n,
         CAST(SUM(s_i) AS BIGINT) AS s,
         CAST(SUM(CAST(m_i * m_i AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS m2,
         {sql_fsum("CAST(s_i AS DOUBLE) * CAST(s_i AS DOUBLE) / CAST(m_i AS DOUBLE)", 8)} AS ssb_raw
  FROM per_c
), mid AS (
  SELECT n, k,
         CAST(s AS DOUBLE) / CAST(n AS DOUBLE) AS p,
         (ssb_raw - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / CAST(n AS DOUBLE))
           / (CAST(k AS DOUBLE) - 1.0) AS msb,
         (CAST(s AS DOUBLE) - ssb_raw) / (CAST(n AS DOUBLE) - CAST(k AS DOUBLE)) AS msw,
         (CAST(n AS DOUBLE) - {sql_dec_to_double("m2")} / CAST(n AS DOUBLE))
           / (CAST(k AS DOUBLE) - 1.0) AS m0
  FROM red
)
SELECT n AS n_orders, k AS k_clusters, p AS p_urgent,
       m0 AS m0_mean_cluster_size,
       CASE WHEN k >= 2 AND msb + (m0 - 1.0) * msw <> 0
            THEN (msb - msw) / (msb + (m0 - 1.0) * msw) END AS icc_anova,
       CASE WHEN k >= 2 AND msb + (m0 - 1.0) * msw <> 0
            THEN 1.0 + (m0 - 1.0) * (msb - msw) / (msb + (m0 - 1.0) * msw)
            END AS deff
FROM mid
"""


# ---------------------------------------------------------------------------
# Successive-difference variance for the systematic sample (round 14)
# ---------------------------------------------------------------------------

SDR_K = 10  # literal take-every-k sampling interval
SDR_OFFSET = 3  # literal start offset


def q_sdr_variance_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Successive-difference variance for a 1-in-{k} SYSTEMATIC sample
    of order values: v_SD(ȳ) = [Σᵢ(yᵢ₊₁ − yᵢ)² / (2(n−1))] / n — the
    estimator the Census Bureau's replication machinery linearizes
    (Wolter 2007 §8), reported against the naive SRS variance s²/n
    whose ratio is the systematic design's effect: under a frame sorted
    by the hash the draws behave like SRS (ratio ≈ 1), while a frame
    sorted by a trend would push it below 1 — the one diagnostic
    ``sample_systematic`` itself cannot provide.

    Exactness: the sample is the deterministic rank-pick rn % {k} =
    {o} over the (md5(orderkey), orderkey) total order (the
    ``sample_systematic`` frame convention); successive differences
    are exact integer cents via one lag window over the sample order;
    Σd² is an exact DECIMAL sum (limb-exact rebuild) and s² uses the
    exact-moment identity — every output is one fixed IEEE sequence.
    Degenerate contract: n < 2 → variances NULL.

    Scale shape: one scan + the shared ``_cum_prev`` bucketed rank
    (hash-prefix buckets — no single-task global sort, r14
    optimization), a 1/{k} filter, one bucketed lag on the SAMPLE
    (within-bucket lag + a ≤1024-row boundary broadcast), one reduce.

    Reference analog: none (engine addition, SURVEY.md §2.7)."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.round(F.col("o_totalprice") * 100, 0).cast("bigint").alias("cents"),
        F.md5(F.col("o_orderkey").cast("string")).alias("h"),
    )
    # rank over the (md5-hex, key) order via the shared bucketed rank
    # decomposition: the first 3 hex chars of the hash are a 4096-way
    # bucket id that is monotone in the lexicographic hash order (equal-
    # length lowercase hex), so bucket-prefix + within-bucket order is the
    # exact global order (r14 optimization; value-identical by the plain
    # ROW_NUMBER oracle).
    hb = F.conv(F.substring(F.col("h"), 1, 3), 16, 10)
    sampled = (
        _cum_prev(
            orders, ["h", "o_orderkey"], {"_rp": F.lit(1)}, bucket=hb, with_totals=True
        )
        .withColumn("rn", F.col("_rp") + F.lit(1))
        .filter(F.col("rn") % SDR_K == SDR_OFFSET)
        .select("rn", "cents", "_rp_tot")
    )
    # bucketed LAG over the sample order: rn is the exact global sample
    # rank, so lag(cents) = within-bucket lag, except each bucket's first
    # row, which takes the PREVIOUS non-empty bucket's last cents
    # (≤1024-row broadcast); the first global row keeps a NULL diff,
    # exactly like the plain LAG.
    sampled = sampled.localCheckpoint(eager=False)
    # The lag-bucket grid's [min, max] over the sampled ranks is known in
    # closed form from the total row count n (_rp_tot, carried from the
    # rank decomposition's offset table — r15 optimization): the sampled
    # ranks are {OFFSET, OFFSET+K, ...}, so min = OFFSET and
    # max = n − ((n − OFFSET) mod K). This removes the separate min/max
    # aggregation over the sample and its broadcast cross join.
    _mx = F.col("_rp_tot") - (F.col("_rp_tot") - F.lit(SDR_OFFSET)) % F.lit(SDR_K)
    rb = F.coalesce(
        F.least(
            F.lit(_CUM_BUCKETS - 1),
            F.floor(
                (F.col("rn") - F.lit(SDR_OFFSET))
                * _CUM_BUCKETS
                / F.nullif((_mx - F.lit(SDR_OFFSET)).cast("double"), F.lit(0.0))
            ),
        ).cast("int"),
        F.lit(0),
    )
    bl = sampled.withColumn("_b", rb).drop("_rp_tot")
    prevs = (
        bl.groupBy("_b")
        .agg(F.max_by("cents", "rn").alias("_blast"))
        .select(
            "_b", F.lag("_blast").over(Window.orderBy("_b")).alias("_prev_last")
        )
    )
    diffs = bl.join(F.broadcast(prevs), "_b").select(
        "cents",
        (
            F.col("cents")
            - F.coalesce(
                F.lag("cents", 1).over(Window.partitionBy("_b").orderBy("rn")),
                F.col("_prev_last"),
            )
        ).alias("d"),
    )
    red = diffs.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("cents").cast("long").alias("s1"),
        F.sum((F.col("cents") * F.col("cents")).cast("decimal(38,0)"))
        .cast("decimal(38,0)")
        .alias("s2"),
        F.sum((F.col("d") * F.col("d")).cast("decimal(38,0)"))
        .cast("decimal(38,0)")
        .alias("sd2"),
    )
    nd = F.col("n").cast("double")
    mean = F.col("s1").cast("double") / nd
    s1d = F.col("s1").cast("double")
    var_pop = (nd * dec_to_double(F.col("s2")) - s1d * s1d) / (
        nd * (nd - F.lit(1.0))
    )
    var_srs = var_pop / nd
    var_sd = dec_to_double(F.col("sd2")) / (F.lit(2.0) * (nd - F.lit(1.0))) / nd
    ok = F.col("n") >= 2
    return red.select(
        F.col("n").alias("n_sample"),
        (mean / F.lit(100.0)).alias("mean_value"),
        F.when(ok, var_srs).alias("var_srs_cents2"),
        F.when(ok, var_sd).alias("var_sd_cents2"),
        F.when(ok & (var_srs > 0), var_sd / var_srs).alias("deff_sd_ratio"),
    )


q_sdr_variance_estimate.__doc__ = q_sdr_variance_estimate.__doc__ and (
    q_sdr_variance_estimate.__doc__.format(k=SDR_K, o=SDR_OFFSET)
)


def _sql_sdr_variance() -> str:
    return f"""
WITH base AS (
  SELECT o_orderkey,
         CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents,
         md5(CAST(o_orderkey AS VARCHAR)) AS h
  FROM orders
), sampled AS (
  SELECT rn, cents FROM (
    SELECT cents, ROW_NUMBER() OVER (ORDER BY h, o_orderkey) AS rn
    FROM base
  ) WHERE rn % {SDR_K} = {SDR_OFFSET}
), diffs AS (
  SELECT cents, cents - LAG(cents, 1) OVER (ORDER BY rn) AS d
  FROM sampled
), red AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(cents) AS BIGINT) AS s1,
         CAST(SUM(CAST(cents * cents AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS s2,
         CAST(SUM(CAST(d * d AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS sd2
  FROM diffs
), mid AS (
  SELECT n,
         CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE) AS mean_c,
         (CAST(n AS DOUBLE) * {sql_dec_to_double("s2")}
          - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE))
           / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0))
           / CAST(n AS DOUBLE) AS var_srs,
         {sql_dec_to_double("sd2")} / (2.0 * (CAST(n AS DOUBLE) - 1.0))
           / CAST(n AS DOUBLE) AS var_sd
  FROM red
)
SELECT n AS n_sample,
       mean_c / 100.0 AS mean_value,
       CASE WHEN n >= 2 THEN var_srs END AS var_srs_cents2,
       CASE WHEN n >= 2 THEN var_sd END AS var_sd_cents2,
       CASE WHEN n >= 2 AND var_srs > 0 THEN var_sd / var_srs END AS deff_sd_ratio
FROM mid
"""


# ---------------------------------------------------------------------------
# Iterative proportional fitting (raking) to uniform margins (round 14)
# ---------------------------------------------------------------------------

IPF_ITERS = 3  # literal double-iterations (row pass + column pass each)


def q_survey_raking_ipf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Survey raking (iterative proportional fitting, Deming & Stephan
    1940) of the (market segment × order priority) cell counts to
    UNIFORM literal margins: after {t} row+column passes each cell
    carries the calibration weight that makes weighted row and column
    shares equal 1/5 — the post-stratification machinery every weighted
    estimate downstream of a non-representative sample needs, with the
    uniform target chosen so the fixture is self-contained (a real
    deployment joins census margins; the plan is identical). The
    reported worst-margin error shows the textbook geometric
    convergence (~3 passes to <1e-3 here).

    Exactness: cell counts are ONE exact hash agg; every IPF pass is a
    25-row broadcast-joined margin agg and one IEEE multiplication per
    cell, unrolled as a FIXED {t}-deep plan (no driver loop over data —
    the iteration count is a literal; margin sums floor-quantize at
    scale 9 so the reduce is partition-order-free). Deterministic on
    both engines by the shared expression structure. Degenerate
    contract: an empty row/column margin (cell family absent) → its
    cells' weights NULL via the guard, surfaced not hidden.

    Scale shape: one fact-sized hash agg to 25 cells; {t}×2 margin aggs
    + broadcast joins on the 25-row frame.

    Reference analog: none (engine addition, SURVEY.md §2.7)."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderpriority"
    )
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    cells = (
        orders.join(F.broadcast(cust), orders["o_custkey"] == cust["c_custkey"])
        .groupBy(
            F.col("c_mktsegment").alias("seg"),
            F.col("o_orderpriority").alias("prio"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n_cell"))
    )
    tot = cells.agg(F.sum("n_cell").cast("long").alias("n_tot"))
    cur = cells.crossJoin(F.broadcast(tot)).select(
        "seg",
        "prio",
        "n_cell",
        "n_tot",
        (F.col("n_cell").cast("double")).alias("w"),
    )
    target = F.col("n_tot").cast("double") / F.lit(5.0)
    for _ in range(IPF_ITERS):
        rows = cur.groupBy("seg").agg(fsum("w", scale=9).alias("row_sum"))
        cur = (
            cur.join(F.broadcast(rows), "seg")
            .withColumn(
                "w",
                F.when(
                    F.col("row_sum") > 0, F.col("w") * target / F.col("row_sum")
                ),
            )
            .drop("row_sum")
        )
        cols = cur.groupBy("prio").agg(fsum("w", scale=9).alias("col_sum"))
        cur = (
            cur.join(F.broadcast(cols), "prio")
            .withColumn(
                "w",
                F.when(
                    F.col("col_sum") > 0, F.col("w") * target / F.col("col_sum")
                ),
            )
            .drop("col_sum")
        )
    final_rows = cur.groupBy("seg").agg(fsum("w", scale=9).alias("row_sum"))
    err = cur.join(F.broadcast(final_rows), "seg").select(
        "seg",
        "prio",
        "n_cell",
        (F.col("w") / F.col("n_cell").cast("double")).alias("rake_weight"),
        (F.abs(F.col("row_sum") - target) / target).alias("row_margin_err"),
    )
    return err.orderBy("seg", "prio")


q_survey_raking_ipf.__doc__ = q_survey_raking_ipf.__doc__ and (
    q_survey_raking_ipf.__doc__.format(t=IPF_ITERS)
)


def _sql_survey_raking() -> str:
    ctes = [
        """cells AS (
  SELECT c_mktsegment AS seg, o_orderpriority AS prio,
         CAST(COUNT(*) AS BIGINT) AS n_cell
  FROM orders JOIN customer ON o_custkey = c_custkey
  GROUP BY 1, 2
)""",
        "tot AS (SELECT CAST(SUM(n_cell) AS BIGINT) AS n_tot FROM cells)",
        """w0 AS (
  SELECT seg, prio, n_cell, n_tot, CAST(n_cell AS DOUBLE) AS w
  FROM cells CROSS JOIN tot
)""",
    ]
    prev = "w0"
    tgt = "CAST(n_tot AS DOUBLE) / 5.0"
    for i in range(1, IPF_ITERS + 1):
        ctes.append(
            f"""r{i} AS (
  SELECT c.seg, c.prio, c.n_cell, c.n_tot,
         CASE WHEN m.row_sum > 0 THEN c.w * ({tgt}) / m.row_sum END AS w
  FROM {prev} c JOIN (
    SELECT seg, {sql_fsum("w", 9)} AS row_sum FROM {prev} GROUP BY seg
  ) m USING (seg)
)"""
        )
        ctes.append(
            f"""c{i} AS (
  SELECT c.seg, c.prio, c.n_cell, c.n_tot,
         CASE WHEN m.col_sum > 0 THEN c.w * ({tgt}) / m.col_sum END AS w
  FROM r{i} c JOIN (
    SELECT prio, {sql_fsum("w", 9)} AS col_sum FROM r{i} GROUP BY prio
  ) m USING (prio)
)"""
        )
        prev = f"c{i}"
    chain = ",\n".join(ctes)
    return f"""
WITH {chain},
fr AS (
  SELECT seg, {sql_fsum("w", 9)} AS row_sum FROM {prev} GROUP BY seg
)
SELECT c.seg, c.prio, c.n_cell,
       c.w / CAST(c.n_cell AS DOUBLE) AS rake_weight,
       ABS(fr.row_sum - CAST(c.n_tot AS DOUBLE) / 5.0)
         / (CAST(c.n_tot AS DOUBLE) / 5.0) AS row_margin_err
FROM {prev} c JOIN fr USING (seg)
ORDER BY c.seg, c.prio
"""


# ---------------------------------------------------------------------------
# Hash-randomization test for the two-sample mean difference (round 14)
# ---------------------------------------------------------------------------

PERM_N = 100  # literal replicate count


def q_permutation_test_hashperm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Randomization test for the urgent vs non-urgent mean order value:
    the observed difference is compared against {p} REPLICATE
    differences, each produced by re-assigning every order to a
    pseudo-group via the RNG-free md5(orderkey ∥ replicate) bit at the
    observed urgent rate — the Dwass (1957) Monte-Carlo randomization
    family with binomial (not fixed-margin) reallocation, documented:
    replicate group sizes float around n₁ like a fresh random labeling,
    which tests the same exchangeability null. p = (#{{|Δᵣ| ≥ |Δ|}} + 1)
    / ({p} + 1), the standard add-one estimator. Where ``welch_ttest``
    leans on normal theory, this is the assumption-free cross-check on
    the SAME contrast — disagreement between them is a distribution-
    shape alarm.

    Exactness: every replicate's group sums are exact integer cents
    from ONE conditional hash agg over the replicate-exploded frame
    (the md5 bit is deterministic on both engines); each Δᵣ is one IEEE
    expression; the comparison count is exact integer. Degenerate
    contract: an empty side in a replicate → that replicate's Δ NULL
    and it drops from the exceedance count (n_valid reported).

    Scale shape: scan × {p} literal replicate spine (map-side explode,
    no shuffle growth beyond the {p}-key agg), one {p}-row reduce. At
    100 TB the explode factor is the knob: replicates shard across
    executors linearly.

    Reference analog: none (engine addition, SURVEY.md §2.7)."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.round(F.col("o_totalprice") * 100, 0).cast("bigint").alias("cents"),
        F.when(F.col("o_orderpriority") == "1-URGENT", F.lit(1))
        .otherwise(F.lit(0))
        .alias("g1"),
    )
    obs = orders.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("g1").cast("long").alias("n1"),
        F.sum(F.when(F.col("g1") == 1, F.col("cents")).otherwise(0))
        .cast("long")
        .alias("s1"),
        F.sum("cents").cast("long").alias("s_all"),
    )
    d_obs = F.col("s1").cast("double") / F.col("n1").cast("double") - (
        F.col("s_all") - F.col("s1")
    ).cast("double") / (F.col("n") - F.col("n1")).cast("double")
    obs = obs.select("n", "n1", d_obs.alias("d_obs"))
    reps = spark.range(PERM_N).select(F.col("id").cast("int").alias("r"))
    # deterministic pseudo-assignment: md5(orderkey:r) low bits vs urgent rate
    exploded = orders.crossJoin(F.broadcast(reps)).crossJoin(F.broadcast(obs))
    h = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat_ws(
                        ":", F.col("o_orderkey").cast("string"), F.col("r")
                    )
                ),
                1,
                12,
            ),
            16,
            10,
        ).cast("long")
        % 1000000
    )
    assigned = exploded.select(
        "r",
        "cents",
        "n",
        "n1",
        "d_obs",
        F.when(
            h
            < (F.col("n1").cast("double") / F.col("n").cast("double"))
            * F.lit(1000000.0),
            F.lit(1),
        )
        .otherwise(F.lit(0))
        .alias("pg"),
    )
    per_r = assigned.groupBy("r").agg(
        F.max("d_obs").alias("d_obs"),
        F.sum("pg").cast("long").alias("m1"),
        F.count(F.lit(1)).cast("long").alias("m"),
        F.sum(F.when(F.col("pg") == 1, F.col("cents")).otherwise(0))
        .cast("long")
        .alias("t1"),
        F.sum("cents").cast("long").alias("t_all"),
    )
    d_rep = F.col("t1").cast("double") / F.col("m1").cast("double") - (
        F.col("t_all") - F.col("t1")
    ).cast("double") / (F.col("m") - F.col("m1")).cast("double")
    valid = (F.col("m1") > 0) & (F.col("m1") < F.col("m"))
    scored = per_r.select(
        "d_obs",
        F.when(valid, d_rep).alias("d_rep"),
    )
    red = scored.agg(
        F.max("d_obs").alias("d_obs"),
        F.count(F.lit(1)).cast("long").alias("n_reps"),
        F.count("d_rep").cast("long").alias("n_valid"),
        F.sum(
            F.when(F.abs(F.col("d_rep")) >= F.abs(F.col("d_obs")), 1).otherwise(0)
        )
        .cast("long")
        .alias("n_ge"),
    )
    return red.select(
        (F.col("d_obs") / F.lit(100.0)).alias("obs_diff_dollars"),
        "n_reps",
        "n_valid",
        "n_ge",
        (
            (F.col("n_ge") + F.lit(1)).cast("double")
            / (F.col("n_valid") + F.lit(1)).cast("double")
        ).alias("p_value"),
    )


q_permutation_test_hashperm.__doc__ = q_permutation_test_hashperm.__doc__ and (
    q_permutation_test_hashperm.__doc__.format(p=PERM_N)
)


def _sql_permutation_test() -> str:
    h = _sql_hex_to_int(
        "md5(CAST(o_orderkey AS VARCHAR) || ':' || CAST(r AS VARCHAR))", 1, 12
    )
    return f"""
WITH base AS (
  SELECT o_orderkey,
         CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents,
         CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END AS g1
  FROM orders
), obs AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(g1) AS BIGINT) AS n1,
         CAST(SUM(CASE WHEN g1 = 1 THEN cents ELSE 0 END) AS BIGINT) AS s1,
         CAST(SUM(cents) AS BIGINT) AS s_all
  FROM base
), obs2 AS (
  SELECT n, n1,
         CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE)
           - CAST(s_all - s1 AS DOUBLE) / CAST(n - n1 AS DOUBLE) AS d_obs
  FROM obs
), reps AS (
  SELECT CAST(UNNEST(RANGE({PERM_N})) AS INT) AS r
), assigned AS (
  SELECT r, cents, n, n1, d_obs,
         CASE WHEN ({h}) % 1000000
                   < (CAST(n1 AS DOUBLE) / CAST(n AS DOUBLE)) * 1000000.0
              THEN 1 ELSE 0 END AS pg
  FROM base CROSS JOIN reps CROSS JOIN obs2
), per_r AS (
  SELECT r, MAX(d_obs) AS d_obs,
         CAST(SUM(pg) AS BIGINT) AS m1,
         CAST(COUNT(*) AS BIGINT) AS m,
         CAST(SUM(CASE WHEN pg = 1 THEN cents ELSE 0 END) AS BIGINT) AS t1,
         CAST(SUM(cents) AS BIGINT) AS t_all
  FROM assigned GROUP BY r
), scored AS (
  SELECT d_obs,
         CASE WHEN m1 > 0 AND m1 < m
              THEN CAST(t1 AS DOUBLE) / CAST(m1 AS DOUBLE)
                   - CAST(t_all - t1 AS DOUBLE) / CAST(m - m1 AS DOUBLE) END AS d_rep
  FROM per_r
), red AS (
  SELECT MAX(d_obs) AS d_obs,
         CAST(COUNT(*) AS BIGINT) AS n_reps,
         CAST(COUNT(d_rep) AS BIGINT) AS n_valid,
         CAST(SUM(CASE WHEN ABS(d_rep) >= ABS(d_obs) THEN 1 ELSE 0 END) AS BIGINT) AS n_ge
  FROM scored
)
SELECT d_obs / 100.0 AS obs_diff_dollars, n_reps, n_valid, n_ge,
       CAST(n_ge + 1 AS DOUBLE) / CAST(n_valid + 1 AS DOUBLE) AS p_value
FROM red
"""


QUERIES = {
    "survey_design_effect": q_survey_design_effect,
    "sdr_variance_estimate": q_sdr_variance_estimate,
    "survey_raking_ipf": q_survey_raking_ipf,
    "permutation_test_hashperm": q_permutation_test_hashperm,
    "brr_variance_estimate": q_brr_variance_estimate,
    "pps_sequential_poisson": q_pps_sequential_poisson,
    "pps_systematic_sample": q_pps_systematic_sample,
    "neyman_allocation": q_neyman_allocation,
    "horvitz_thompson": q_horvitz_thompson,
    "quantile_normalize_deciles": q_quantile_normalize_deciles,
    "shard_manifest": q_shard_manifest,
    "stratified_sample": q_stratified_sample,
    "curation_pipeline": q_curation_pipeline,
    "sequence_pack": q_sequence_pack,
    "multimodal_curation_join": q_multimodal_curation_join,
    "split_assign": q_split_assign,
    "decontaminate": q_decontaminate,
    "domain_mixture": q_domain_mixture,
    "importance_sample": q_importance_sample,
    "negative_sampling": q_negative_sampling,
    "token_budget_fill": q_token_budget_fill,
    "sample_systematic": q_sample_systematic,
}

ORACLE = {
    "survey_design_effect": _sql_survey_deff(),
    "sdr_variance_estimate": _sql_sdr_variance(),
    "survey_raking_ipf": _sql_survey_raking(),
    "permutation_test_hashperm": _sql_permutation_test(),
    "brr_variance_estimate": _sql_brr(),
    "pps_sequential_poisson": _ORACLE_SPS,
    "pps_systematic_sample": _ORACLE_PPS_SYSTEMATIC,
    "neyman_allocation": _sql_neyman(),
    "horvitz_thompson": _sql_horvitz_thompson(),
    "quantile_normalize_deciles": _ORACLE_QNORM,
    "shard_manifest": _ORACLE_SHARD_MANIFEST,
    "stratified_sample": _ORACLE_STRATIFIED_SAMPLE,
    "curation_pipeline": _ORACLE_CURATION_PIPELINE,
    "sequence_pack": _ORACLE_SEQUENCE_PACK,
    "multimodal_curation_join": _ORACLE_MULTIMODAL_CURATION_JOIN,
    "split_assign": _ORACLE_SPLIT_ASSIGN,
    "decontaminate": _ORACLE_DECONTAMINATE,
    "domain_mixture": _ORACLE_DOMAIN_MIXTURE,
    "importance_sample": _ORACLE_IMPORTANCE_SAMPLE,
    "negative_sampling": _sql_negative_sampling(),
    "token_budget_fill": _ORACLE_TOKEN_BUDGET_FILL,
    "sample_systematic": _ORACLE_SYSTEMATIC,
}
