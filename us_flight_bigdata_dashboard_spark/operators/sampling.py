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

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from us_flight_bigdata_dashboard_spark.operators.dedup import (
    _shingle_array,
    _sql_hex_to_int,
    _sql_shingles,
)
from us_flight_bigdata_dashboard_spark.sources.catalog import load_table

# per-language keep percentage (language rebalancing: downsample the
# over-represented head, keep more of the tail)
STRATA_PCT = {"en": 50, "zh": 20}
STRATA_DEFAULT_PCT = 10

SPLIT_TRAIN_PCT = 80  # [0,80) train, [80,90) valid, [90,100) test
SPLIT_VALID_PCT = 90

DECONTAM_NGRAM = 8
N_BENCH_DOCS = 10


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
    word-8-gram with the benchmark set (here: doc_id < N_BENCH_DOCS stands
    in for an eval suite), with the overlap count. 8-grams are the
    published decontamination unit (GPT-3 used 13-grams, Gopher 8-grams —
    long enough that natural reuse is rare).

    Scale shape: benchmark suites are tiny versus the corpus, so the
    benchmark's distinct shingle set broadcasts; the corpus side is a
    narrow explode + broadcast semi-shaped join + one aggregation over the
    (few) contaminated docs. The corpus never shuffles its text."""
    docs = load_table(spark, sf_dir, "documents")
    sh = docs.select("doc_id", F.explode(_shingle_array(DECONTAM_NGRAM)).alias("shingle"))
    bench = (
        sh.filter(F.col("doc_id") < N_BENCH_DOCS).select("shingle").distinct()
    )
    return (
        sh.filter(F.col("doc_id") >= N_BENCH_DOCS)
        .join(F.broadcast(bench), "shingle")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_overlap_shingles"))
    )


_ORACLE_DECONTAMINATE = f"""
WITH sh AS ({_sql_shingles(DECONTAM_NGRAM)}),
bench AS (SELECT DISTINCT shingle FROM sh WHERE doc_id < {N_BENCH_DOCS})
SELECT s.doc_id, COUNT(*) AS n_overlap_shingles
FROM sh s JOIN bench USING (shingle)
WHERE s.doc_id >= {N_BENCH_DOCS}
GROUP BY 1
"""


QUERIES = {
    "stratified_sample": q_stratified_sample,
    "split_assign": q_split_assign,
    "decontaminate": q_decontaminate,
}

ORACLE = {
    "stratified_sample": _ORACLE_STRATIFIED_SAMPLE,
    "split_assign": _ORACLE_SPLIT_ASSIGN,
    "decontaminate": _ORACLE_DECONTAMINATE,
}
