"""Text-analysis operators over the ``documents`` table (north-star extension,
SURVEY.md §7 phase 7 — the operations a 100 TB training-data pipeline needs).

All operators are pure column expressions (no UDFs): tokenization, quality
scoring, language-ID, and fingerprinting run inside whole-stage codegen and
scale linearly with partitions. Each has an exact DuckDB oracle — integer
counts and integer-derived ratios, so results are bit-identical by
construction (no float-order sensitivity).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from us_flight_bigdata_dashboard_spark.functions.exact import (
    dec_to_double,
    sql_dec_to_double,
    davg,
    dsum,
    fsum,
    sql_davg,
    sql_dsum,
    sql_exact_log2_ctes,
    sql_fsum,
    with_exact_log2,
)
from us_flight_bigdata_dashboard_spark.sources.catalog import load_table

# Small per-language stopword lexicons for the n-gram/stopword language-ID
# heuristic. Token-exact matching over a lowercased whitespace split.
STOPWORDS = {
    "en": ["the", "a", "of", "and", "to"],
    "de": ["der", "die", "und", "ist", "das"],
    "fr": ["le", "la", "et", "les", "des"],
    "es": ["el", "los", "y", "una", "como"],
    "zh": ["的", "是", "了", "在", "和"],
}

# BPE-ish word/number/symbol tokenizer — portable regex (same semantics in
# Java regex and RE2): letter runs, digit runs, single non-space symbols.
BPE_PATTERN = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"


def _tokens(col):
    """Lowercased whitespace tokens (empty strings filtered)."""
    return F.filter(F.split(F.lower(col), " "), lambda t: t != "")


def _stop_hits(col, words: list[str]):
    """Count of tokens ∈ lexicon (integer — exact on both engines)."""
    arr = F.array(*[F.lit(w) for w in words])
    return F.size(F.filter(_tokens(col), lambda t: F.array_contains(arr, t)))


def _sql_tokens(expr: str) -> str:
    return f"list_filter(string_split(lower({expr}), ' '), t -> t <> '')"


def _sql_stop_hits(expr: str, words: list[str]) -> str:
    lst = ", ".join(f"'{w}'" for w in words)
    return f"CAST(len(list_filter({_sql_tokens(expr)}, t -> t IN ({lst}))) AS INTEGER)"


# ---------------------------------------------------------------------------
# Token counting
# ---------------------------------------------------------------------------

def q_text_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whitespace + BPE-ish token counts per document."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.length("text").alias("n_chars_measured"),
        F.size(_tokens(F.col("text"))).alias("n_ws_tokens"),
        F.size(F.regexp_extract_all(F.col("text"), F.lit(BPE_PATTERN), 0)).alias("n_bpe_tokens"),
    )


_ORACLE_TEXT_TOKEN_COUNT = f"""
SELECT doc_id,
       CAST(length(text) AS INTEGER) AS n_chars_measured,
       CAST(len({_sql_tokens("text")}) AS INTEGER) AS n_ws_tokens,
       CAST(len(regexp_extract_all(text, '{BPE_PATTERN}')) AS INTEGER) AS n_bpe_tokens
FROM documents
"""


# ---------------------------------------------------------------------------
# Quality scoring
# ---------------------------------------------------------------------------

def q_text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic quality metrics: length, mean token length, stopword ratio,
    symbol ratio — plus a keep/drop flag. Ratios are integer/integer double
    divisions (bit-stable). Zero-token / zero-char documents yield NULL
    ratios via an explicit ``nullif`` divisor in BOTH engines (Spark's
    non-ANSI ÷0→NULL vs DuckDB's ÷0 behavior would otherwise diverge on
    such input); their keep flag is 0 through ordinary NULL-AND-false
    logic."""
    docs = load_table(spark, sf_dir, "documents")
    # Materialize the token array behind a projection boundary: every
    # ratio below references it, and inlined it would re-split per use
    # (see dedup.shingles_exploded for the measured effect).
    staged = docs.select("doc_id", "text", _tokens(F.col("text")).alias("_toks"))
    toks = F.col("_toks")
    n_tok = F.size(toks)
    n_tok_nz = F.nullif(n_tok, F.lit(0))
    n_chars_nz = F.nullif(F.length("text"), F.lit(0))
    n_alpha = F.length(F.regexp_replace(F.col("text"), "[^A-Za-z]", ""))
    n_sym = F.length(F.regexp_replace(F.col("text"), "[A-Za-z0-9\\s]", ""))
    _stop_arr = F.array(*[F.lit(w) for w in STOPWORDS["en"]])
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(_stop_arr, t)))
    out = staged.select(
        "doc_id",
        F.length("text").alias("n_chars_measured"),
        n_tok.alias("n_tokens"),
        (F.length("text").cast("double") / n_tok_nz).alias("mean_token_len"),
        (n_stop.cast("double") / n_tok_nz).alias("stopword_ratio"),
        (n_sym.cast("double") / n_chars_nz).alias("symbol_ratio"),
        (n_alpha.cast("double") / n_chars_nz).alias("alpha_ratio"),
    )
    return out.withColumn(
        "keep",
        (
            (F.col("n_tokens") >= 10)
            & (F.col("mean_token_len") >= 3.0)
            & (F.col("mean_token_len") <= 12.0)
            & (F.col("symbol_ratio") <= 0.1)
        ).cast("int"),
    )


_ORACLE_TEXT_QUALITY = f"""
SELECT *,
       CAST(n_tokens >= 10 AND mean_token_len >= 3.0 AND mean_token_len <= 12.0
            AND symbol_ratio <= 0.1 AS INTEGER) AS keep
FROM (
  SELECT doc_id,
         CAST(length(text) AS INTEGER) AS n_chars_measured,
         CAST(len({_sql_tokens("text")}) AS INTEGER) AS n_tokens,
         CAST(length(text) AS DOUBLE) / nullif(len({_sql_tokens("text")}), 0) AS mean_token_len,
         CAST({_sql_stop_hits("text", STOPWORDS["en"])} AS DOUBLE) / nullif(len({_sql_tokens("text")}), 0) AS stopword_ratio,
         CAST(length(regexp_replace(text, '[A-Za-z0-9\\s]', '', 'g')) AS DOUBLE) / nullif(length(text), 0) AS symbol_ratio,
         CAST(length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS DOUBLE) / nullif(length(text), 0) AS alpha_ratio
  FROM documents
)
"""


# ---------------------------------------------------------------------------
# Rule-ensemble quality filter (Gopher-style)
# ---------------------------------------------------------------------------

# Ordered (name, description) rule list — the filter reports the FIRST
# failing rule per document, so order is part of the operator contract.
# Thresholds follow the published Gopher/C4 heuristics, adjusted to the
# synthetic corpus' token-length distribution so both keep and drop
# branches are exercised under the gate (production values in parens).
QF_MIN_WORDS = 30  # Gopher: 50
QF_MAX_WORDS = 100_000
QF_MEAN_WORD_LEN_MIN = 3.0
QF_MEAN_WORD_LEN_MAX = 10.0
QF_MAX_SYMBOL_RATIO = 0.1
QF_MIN_DISTINCT_RATIO = 0.4  # repetition proxy: unique/total tokens
QF_REQUIRED_STOPWORDS = ["the", "a", "of", "and", "to", "is", "in", "that"]
QF_MIN_STOPWORD_KINDS = 2  # Gopher: ≥2 of a required-stopword list


def q_quality_filter_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style rule-ensemble document filter — the standard pretraining
    curation stage (Rae et al. 2021 §A1.1; C4's heuristics are the same
    shape): an ORDERED list of cheap structural rules, each document keeps
    only if every rule passes, and the output carries the FIRST failing
    rule's name as ``fail_reason`` plus the total failed count — the
    reason codes are what a curation team audits (per-reason drop rates
    per source/crawl snapshot).

    Rules, in contract order: word-count bounds, mean word length window,
    symbol-to-char ratio, distinct-token ratio (repetition proxy — the
    cheap stand-in for Gopher's duplicate-line fraction on single-line
    docs), and a required-stopword count (≥{QF_MIN_STOPWORD_KINDS} of
    {QF_REQUIRED_STOPWORDS} present — Gopher's "contains 2 of ..." rule).

    Scale shape: a single narrow projection — tokenization happens ONCE
    behind a projection boundary and every rule reads the materialized
    array; zero shuffles, zero UDFs, whole-stage-codegen throughout, so
    the filter scans at parquet speed at 100 TB. All rule inputs are
    integer counts or integer/integer double divisions (bit-identical
    cross-engine); zero-token documents fail the word-count rule before
    any NULL ratio is consulted, and per-rule flags use explicit
    NULL→false coalescing so ``n_rules_failed`` is total even when a
    ratio is undefined.
    """
    docs = load_table(spark, sf_dir, "documents")
    staged = docs.select("doc_id", "text", _tokens(F.col("text")).alias("_toks"))
    toks = F.col("_toks")
    n = F.size(toks)
    n_nz = F.nullif(n, F.lit(0))
    tok_chars = F.aggregate(
        F.transform(toks, lambda t: F.length(t)), F.lit(0), lambda acc, x: acc + x
    )
    mean_wl = tok_chars.cast("double") / n_nz
    n_sym = F.length(F.regexp_replace(F.col("text"), "[A-Za-z0-9\\s]", ""))
    sym_ratio = n_sym.cast("double") / F.nullif(F.length("text"), F.lit(0))
    distinct_ratio = F.size(F.array_distinct(toks)).cast("double") / n_nz
    stop_arr = F.array(*[F.lit(w) for w in QF_REQUIRED_STOPWORDS])
    stop_kinds = F.size(F.filter(stop_arr, lambda w: F.array_contains(toks, w)))

    measured = staged.select(
        "doc_id",
        n.alias("n_tokens"),
        mean_wl.alias("mean_word_len"),
        sym_ratio.alias("symbol_ratio"),
        distinct_ratio.alias("distinct_ratio"),
        stop_kinds.alias("stopword_kinds"),
    )
    rules = [
        ("too_few_words", F.col("n_tokens") < QF_MIN_WORDS),
        ("too_many_words", F.col("n_tokens") > QF_MAX_WORDS),
        (
            "mean_word_len_out_of_range",
            (F.col("mean_word_len") < QF_MEAN_WORD_LEN_MIN)
            | (F.col("mean_word_len") > QF_MEAN_WORD_LEN_MAX),
        ),
        ("symbol_ratio_high", F.col("symbol_ratio") > QF_MAX_SYMBOL_RATIO),
        ("repetitive", F.col("distinct_ratio") < QF_MIN_DISTINCT_RATIO),
        ("few_stopwords", F.col("stopword_kinds") < QF_MIN_STOPWORD_KINDS),
    ]
    reason = F.lit(None).cast("string")
    for name, cond in reversed(rules):
        reason = F.when(F.coalesce(cond, F.lit(False)), F.lit(name)).otherwise(reason)
    n_failed = sum(
        F.coalesce(cond.cast("int"), F.lit(0)) for _, cond in rules
    )
    return measured.select(
        "doc_id",
        "n_tokens",
        "mean_word_len",
        "symbol_ratio",
        "distinct_ratio",
        "stopword_kinds",
        n_failed.alias("n_rules_failed"),
        reason.alias("fail_reason"),
    ).withColumn("keep", F.col("fail_reason").isNull().cast("int"))


def _sql_quality_filter_rules() -> str:
    stop_lst = ", ".join(f"'{w}'" for w in QF_REQUIRED_STOPWORDS)
    return f"""
WITH staged AS (
  SELECT doc_id, text, {_sql_tokens("text")} AS toks FROM documents
), measured AS (
  SELECT doc_id,
         CAST(len(toks) AS INTEGER) AS n_tokens,
         CAST(list_sum(list_transform(toks, t -> length(t))) AS DOUBLE)
           / nullif(len(toks), 0) AS mean_word_len,
         CAST(length(regexp_replace(text, '[A-Za-z0-9\\s]', '', 'g')) AS DOUBLE)
           / nullif(length(text), 0) AS symbol_ratio,
         CAST(len(list_distinct(toks)) AS DOUBLE) / nullif(len(toks), 0) AS distinct_ratio,
         CAST(len(list_filter([{stop_lst}], w -> list_contains(toks, w))) AS INTEGER)
           AS stopword_kinds
  FROM staged
)
SELECT doc_id, n_tokens, mean_word_len, symbol_ratio, distinct_ratio, stopword_kinds,
       (COALESCE(CAST(n_tokens < {QF_MIN_WORDS} AS INTEGER), 0)
        + COALESCE(CAST(n_tokens > {QF_MAX_WORDS} AS INTEGER), 0)
        + COALESCE(CAST(mean_word_len < {QF_MEAN_WORD_LEN_MIN}
                        OR mean_word_len > {QF_MEAN_WORD_LEN_MAX} AS INTEGER), 0)
        + COALESCE(CAST(symbol_ratio > {QF_MAX_SYMBOL_RATIO} AS INTEGER), 0)
        + COALESCE(CAST(distinct_ratio < {QF_MIN_DISTINCT_RATIO} AS INTEGER), 0)
        + COALESCE(CAST(stopword_kinds < {QF_MIN_STOPWORD_KINDS} AS INTEGER), 0)
       ) AS n_rules_failed,
       CASE
         WHEN n_tokens < {QF_MIN_WORDS} THEN 'too_few_words'
         WHEN n_tokens > {QF_MAX_WORDS} THEN 'too_many_words'
         WHEN mean_word_len < {QF_MEAN_WORD_LEN_MIN}
              OR mean_word_len > {QF_MEAN_WORD_LEN_MAX} THEN 'mean_word_len_out_of_range'
         WHEN symbol_ratio > {QF_MAX_SYMBOL_RATIO} THEN 'symbol_ratio_high'
         WHEN distinct_ratio < {QF_MIN_DISTINCT_RATIO} THEN 'repetitive'
         WHEN stopword_kinds < {QF_MIN_STOPWORD_KINDS} THEN 'few_stopwords'
       END AS fail_reason,
       CASE WHEN n_tokens < {QF_MIN_WORDS} OR n_tokens > {QF_MAX_WORDS}
                 OR mean_word_len < {QF_MEAN_WORD_LEN_MIN}
                 OR mean_word_len > {QF_MEAN_WORD_LEN_MAX}
                 OR symbol_ratio > {QF_MAX_SYMBOL_RATIO}
                 OR distinct_ratio < {QF_MIN_DISTINCT_RATIO}
                 OR stopword_kinds < {QF_MIN_STOPWORD_KINDS}
            THEN 0 ELSE 1 END AS keep
FROM measured
"""


# ---------------------------------------------------------------------------
# Language identification
# ---------------------------------------------------------------------------

def q_text_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword-lexicon language ID: per-language hit counts unpivoted, then
    argmax via deterministic window rank (score desc, lang asc); zero-score
    docs → 'unknown'. Compares against the metadata ``lang`` column."""
    docs = load_table(spark, sf_dir, "documents")
    scored = docs.select(
        "doc_id",
        F.col("lang").alias("lang_meta"),
        *[_stop_hits(F.col("text"), ws).alias(f"score_{lang}") for lang, ws in STOPWORDS.items()],
    )
    stack_args = ", ".join(f"'{lang}', score_{lang}" for lang in STOPWORDS)
    long = scored.select(
        "doc_id",
        "lang_meta",
        F.expr(f"stack({len(STOPWORDS)}, {stack_args}) AS (cand_lang, score)"),
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("score").desc(), F.col("cand_lang").asc())
    best = long.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") == 1)
    return best.select(
        "doc_id",
        "lang_meta",
        F.when(F.col("score") > 0, F.col("cand_lang")).otherwise(F.lit("unknown")).alias("pred_lang"),
        F.col("score").alias("best_score"),
        (F.col("lang_meta") == F.when(F.col("score") > 0, F.col("cand_lang")).otherwise(F.lit("unknown"))).cast("int").alias("agrees_meta"),
    )


def _sql_langid() -> str:
    score_cols = ",\n         ".join(
        f"{_sql_stop_hits('text', ws)} AS score_{lang}" for lang, ws in STOPWORDS.items()
    )
    unpivot = " UNION ALL ".join(
        f"SELECT doc_id, lang_meta, '{lang}' AS cand_lang, score_{lang} AS score FROM scored"
        for lang in STOPWORDS
    )
    return f"""
WITH scored AS (
  SELECT doc_id, lang AS lang_meta,
         {score_cols}
  FROM documents
), long AS ({unpivot}),
best AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY score DESC, cand_lang ASC) AS rn
  FROM long
)
SELECT doc_id, lang_meta,
       CASE WHEN score > 0 THEN cand_lang ELSE 'unknown' END AS pred_lang,
       score AS best_score,
       CAST(lang_meta = (CASE WHEN score > 0 THEN cand_lang ELSE 'unknown' END) AS INTEGER) AS agrees_meta
FROM best WHERE rn = 1
"""


# ---------------------------------------------------------------------------
# Document fingerprinting
# ---------------------------------------------------------------------------

def q_text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Normalization fingerprint: lowercase, strip non-alphanumerics to
    single spaces, collapse+trim, md5 — the canonical-form key used for
    fuzzy-exact dedup at scale."""
    docs = load_table(spark, sf_dir, "documents")
    norm = F.trim(F.regexp_replace(F.regexp_replace(F.lower(F.col("text")), "[^a-z0-9]+", " "), " +", " "))
    return docs.select(
        "doc_id",
        F.md5(norm).alias("fingerprint"),
        F.length(norm).alias("norm_len"),
    )


_ORACLE_TEXT_FINGERPRINT = """
SELECT doc_id,
       md5(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'), ' +', ' ', 'g'))) AS fingerprint,
       CAST(length(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'), ' +', ' ', 'g'))) AS INTEGER) AS norm_len
FROM documents
"""


# ---------------------------------------------------------------------------
# PII redaction
# ---------------------------------------------------------------------------

# Portable across Java regex (Spark) and RE2 (DuckDB): no lookaround, no
# backrefs. Email, dashed/dotted/spaced phone, long digit runs (IDs/accounts).
PII_EMAIL = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
PII_PHONE = "\\d{3}[-. ]\\d{3}[-. ]\\d{4}"
PII_LONGNUM = "\\d{6,}"


def q_text_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrubbing for training-data curation: mask emails, phone numbers,
    and long digit runs with typed placeholder tokens, and count what was
    masked per document. Pure ``regexp_replace``/``regexp_extract_all``
    column expressions — whole-stage codegen, linear scan, no UDFs, so the
    pass costs one projection over the corpus at 100 TB.

    Order matters: phones are masked before long digit runs so a phone isn't
    half-eaten by the ID rule; the oracle applies the same order. The
    synthetic corpus contains no PII (redaction is the identity there — the
    matrix entry verifies the regex plumbing agrees across engines);
    positive matches are exercised by the crafted fixtures in
    ``tests/test_text_crafted.py``."""
    docs = load_table(spark, sf_dir, "documents")
    n_emails = F.size(F.regexp_extract_all(F.col("text"), F.lit(PII_EMAIL), 0))
    redacted = F.regexp_replace(F.col("text"), PII_EMAIL, "<EMAIL>")
    n_phones = F.size(F.regexp_extract_all(redacted, F.lit(PII_PHONE), 0))
    redacted = F.regexp_replace(redacted, PII_PHONE, "<PHONE>")
    n_longnums = F.size(F.regexp_extract_all(redacted, F.lit(PII_LONGNUM), 0))
    redacted = F.regexp_replace(redacted, PII_LONGNUM, "<NUM>")
    return docs.select(
        "doc_id",
        n_emails.alias("n_emails"),
        n_phones.alias("n_phones"),
        n_longnums.alias("n_longnums"),
        F.md5(redacted).alias("redacted_digest"),
        F.length(redacted).alias("redacted_len"),
    )


_ORACLE_TEXT_PII_REDACT = f"""
SELECT doc_id,
       CAST(len(regexp_extract_all(text, '{PII_EMAIL}')) AS INTEGER) AS n_emails,
       CAST(len(regexp_extract_all(r1, '{PII_PHONE}')) AS INTEGER) AS n_phones,
       CAST(len(regexp_extract_all(r2, '{PII_LONGNUM}')) AS INTEGER) AS n_longnums,
       md5(regexp_replace(r2, '{PII_LONGNUM}', '<NUM>', 'g')) AS redacted_digest,
       CAST(length(regexp_replace(r2, '{PII_LONGNUM}', '<NUM>', 'g')) AS INTEGER) AS redacted_len
FROM (
  SELECT doc_id, text,
         regexp_replace(text, '{PII_EMAIL}', '<EMAIL>', 'g') AS r1,
         regexp_replace(regexp_replace(text, '{PII_EMAIL}', '<EMAIL>', 'g'),
                        '{PII_PHONE}', '<PHONE>', 'g') AS r2
  FROM documents
)
"""


# ---------------------------------------------------------------------------
# TF-IDF-style term salience (top-k terms per document)
# ---------------------------------------------------------------------------

TFIDF_TOPK = 3


def q_text_tfidf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-``TFIDF_TOPK`` salient terms per document, scored ``tf/df``
    (term frequency over corpus document frequency — the idf-log variant
    is avoided deliberately: ``ln`` is not guaranteed correctly rounded
    across engines, while one IEEE double division is bit-exact, so the
    gate stays a hash compare).

    Scale shape: the corpus is tokenized and exploded ONCE; (doc,term) tf
    is a map-side-combined hash agg, and df falls out of tf for free — tf
    already has exactly one row per (doc,term), so df(term) is a plain
    ``count over (partition by term)`` window on the aggregated rows (no
    second scan, no second explode, no join; an earlier draft re-exploded
    the corpus for df and paid 2 scans + 5 exchanges — this shape is
    1 scan + 3 exchanges, all post-aggregation). The final top-k is one
    keyed window per document. No step is quadratic and nothing collects."""
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select("doc_id", F.explode(_tokens(F.col("text"))).alias("term"))
    tf = tok.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    n_docs = docs.count()  # scalar; one job over parquet row-group metadata
    df_w = Window.partitionBy("term")
    scored = tf.select(
        "doc_id",
        "term",
        "tf",
        F.count(F.lit(1)).over(df_w).alias("df"),
    ).select(
        "doc_id",
        "term",
        "tf",
        "df",
        (F.col("tf").cast("double") / F.col("df")).alias("salience"),
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.col("salience").desc(), F.col("term").asc()
    )
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= TFIDF_TOPK)
        .select("doc_id", "term", "tf", "df", "salience", "rk")
        .withColumn("n_docs", F.lit(n_docs).cast("long"))
    )


_ORACLE_TEXT_TFIDF_TOPK = f"""
WITH tok AS (
  SELECT doc_id, unnest({_sql_tokens("text")}) AS term FROM documents
), tf AS (
  SELECT doc_id, term, COUNT(*) AS tf FROM tok GROUP BY 1, 2
), df AS (
  SELECT term, COUNT(DISTINCT doc_id) AS df FROM tok GROUP BY 1
), scored AS (
  SELECT tf.doc_id, tf.term, tf.tf, df.df,
         CAST(tf.tf AS DOUBLE) / df.df AS salience
  FROM tf JOIN df USING (term)
)
SELECT doc_id, term, tf, df, salience, rk,
       (SELECT COUNT(*) FROM documents) AS n_docs
FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY salience DESC, term ASC) AS rk
  FROM scored
)
WHERE rk <= {TFIDF_TOPK}
"""


# ---------------------------------------------------------------------------
# Vocabulary build + sequence encoding
# ---------------------------------------------------------------------------

VOCAB_SIZE = 30


def q_text_vocab_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-driven vocabulary build + document encoding: the top
    ``VOCAB_SIZE`` terms by frequency become ids 1..N (0 = OOV), and every
    document is rewritten as its id sequence — the tokenizer-lite encode
    step that turns curated text into trainer input.

    Scale shape: the vocab is one hash-agg over the exploded corpus
    followed by a top-N (tiny — vocabulary-sized), then BROADCAST to the
    encode side, so encoding is a narrow per-token map join; sequence
    order is preserved by carrying ``posexplode`` positions through the
    join and reassembling with ``sort_array(collect_list(struct(pos,
    id)))`` (collect_list alone has no order guarantee — the sort makes
    the array deterministic under any partitioning). One corpus shuffle
    total (the doc_id regroup).

    The sequence is emitted as a space-joined string column
    (``token_ids``) rather than ``array<int>`` so downstream engines
    that hash/sort result cells (including the correctness driver)
    handle it; the encoding is lossless and order-preserving."""
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id", F.posexplode(_tokens(F.col("text"))).alias("pos", "term")
    )
    # top-k FIRST via TakeOrdered (distributed per-partition top-n; r14
    # optimization — the rank window now runs over <=VOCAB_SIZE rows, not
    # the whole vocabulary), then the identical row_number on the survivors
    vocab = (
        tok.groupBy("term")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), F.col("term").asc())
        .limit(VOCAB_SIZE)
        .select(
            "term",
            F.row_number()
            .over(Window.orderBy(F.col("n").desc(), F.col("term").asc()))
            .alias("token_id"),
        )
    )
    return (
        tok.join(F.broadcast(vocab), "term", "left")
        .select("doc_id", "pos", F.coalesce("token_id", F.lit(0)).alias("token_id"))
        .groupBy("doc_id")
        .agg(
            F.array_join(
                F.transform(
                    F.sort_array(F.collect_list(F.struct("pos", "token_id"))),
                    lambda s: s["token_id"].cast("string"),
                ),
                " ",
            ).alias("token_ids"),
            F.count(F.lit(1)).alias("seq_len"),
            F.sum(F.when(F.col("token_id") == 0, 1).otherwise(0)).alias("n_oov"),
        )
    )


_ORACLE_TEXT_VOCAB_ENCODE = f"""
WITH tok AS (
  SELECT doc_id, u['term'] AS term, CAST(u['pos'] AS INTEGER) AS pos
  FROM (
    SELECT doc_id,
           unnest(list_transform({_sql_tokens("text")},
                                 (x, i) -> {{'term': x, 'pos': i - 1}})) AS u
    FROM documents
  )
), vocab AS (
  SELECT term, token_id FROM (
    SELECT term,
           ROW_NUMBER() OVER (ORDER BY COUNT(*) DESC, term ASC) AS token_id
    FROM tok GROUP BY term
  ) WHERE token_id <= {VOCAB_SIZE}
), mapped AS (
  SELECT t.doc_id, t.pos, COALESCE(v.token_id, 0) AS token_id
  FROM tok t LEFT JOIN vocab v USING (term)
)
SELECT doc_id,
       string_agg(CAST(token_id AS VARCHAR), ' ' ORDER BY pos ASC) AS token_ids,
       COUNT(*) AS seq_len,
       CAST(SUM(CASE WHEN token_id = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_oov
FROM mapped
GROUP BY doc_id
"""


# ---------------------------------------------------------------------------
# JSON property extraction (events.props)
# ---------------------------------------------------------------------------

def q_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON field extraction + aggregation over the event stream's ``props``
    payload (JSON function surface — absent from the reference, required for
    real event pipelines)."""
    events = load_table(spark, sf_dir, "events")
    k = F.get_json_object(F.col("props"), "$.k").cast("int")
    return (
        events.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("k").alias("sum_k"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
        )
    )


_ORACLE_JSON_EXTRACT = """
SELECT event_type,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(props->>'k' AS INTEGER)) AS BIGINT) AS sum_k,
       MIN(CAST(props->>'k' AS INTEGER)) AS min_k,
       MAX(CAST(props->>'k' AS INTEGER)) AS max_k
FROM events
GROUP BY 1
"""


# ---------------------------------------------------------------------------
# Repetition signals (Gopher-style quality filters)
# ---------------------------------------------------------------------------

def _ngram_list(toks, n: int):
    """All (non-distinct) word n-grams of a token array, in order."""
    return F.transform(
        F.sequence(F.lit(1), F.size(toks) - n + 1),
        lambda i: F.concat_ws(" ", F.slice(toks, i, n)),
    )


def _sql_ngram_list(toks_expr: str, n: int) -> str:
    return (
        f"list_transform(generate_series(1, len({toks_expr}) - {n} + 1), "
        f"i -> array_to_string(list_slice({toks_expr}, i, i + {n} - 1), ' '))"
    )


def q_text_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition signals per document: unique-token ratio and
    duplicate bi/tri-gram fractions (Rae et al. 2021 §A1.1 quality filters —
    high duplicate-n-gram fraction marks low-quality/spammy text).

    Scale shape: pure array expressions over each row — no explode, no
    shuffle, whole-stage codegen, linear in corpus size. The ratios are
    integer/integer divisions of exact counts, so Spark and DuckDB agree
    bit-for-bit; docs too short for an n-gram yield NULL via a nullif guard
    (defined identically in both engines).
    """
    docs = load_table(spark, sf_dir, "documents")
    # Two staged projections: tokens first, then the bigram/trigram lists —
    # each n-gram list is referenced three times by dup_frac (size,
    # distinct-size, nullif divisor), so inlined they'd be rebuilt thrice
    # per row; staged they're attribute references.
    staged = docs.select("doc_id", _tokens(F.col("text")).alias("_toks"))
    toks = F.col("_toks")
    n = F.size(toks)
    grammed = staged.select(
        "doc_id",
        "_toks",
        F.when(n >= 2, _ngram_list(toks, 2)).alias("_g2"),
        F.when(n >= 3, _ngram_list(toks, 3)).alias("_g3"),
    )

    def dup_frac(grams):
        cnt = F.size(grams)
        return (cnt - F.size(F.array_distinct(grams))) / F.nullif(cnt, F.lit(0))

    return grammed.select(
        "doc_id",
        n.alias("n_tokens"),
        (F.size(F.array_distinct(toks)) / F.nullif(n, F.lit(0))).alias("uniq_token_ratio"),
        dup_frac(F.col("_g2")).alias("dup_bigram_frac"),
        dup_frac(F.col("_g3")).alias("dup_trigram_frac"),
    )


def _sql_dup_frac(grams: str) -> str:
    return (
        f"(CAST(len({grams}) - len(list_distinct({grams})) AS DOUBLE)"
        f" / nullif(len({grams}), 0))"
    )


_ORACLE_TEXT_REPETITION = f"""
SELECT doc_id,
       CAST(len(toks) AS INTEGER) AS n_tokens,
       CAST(len(list_distinct(toks)) AS DOUBLE) / nullif(len(toks), 0) AS uniq_token_ratio,
       CASE WHEN len(toks) >= 2 THEN {_sql_dup_frac(_sql_ngram_list("toks", 2))} END
         AS dup_bigram_frac,
       CASE WHEN len(toks) >= 3 THEN {_sql_dup_frac(_sql_ngram_list("toks", 3))} END
         AS dup_trigram_frac
FROM (SELECT doc_id, {_sql_tokens("text")} AS toks FROM documents)
"""


# ---------------------------------------------------------------------------
# Corpus n-gram counting (LM vocabulary statistics)
# ---------------------------------------------------------------------------

NGRAM_TOP_K = 20


def q_text_ngram_top(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-wide top-K trigram counts (language-model count collection /
    vocabulary statistics — occurrences, not per-doc-distinct like the dedup
    shingles).

    Scale shape: explode → hash aggregate (partial map-side combine) → a
    single top-K sort on the *aggregated* table (|distinct trigrams| ≪
    corpus size). Total order with a lexical tiebreak makes LIMIT
    deterministic on both engines.
    """
    docs = load_table(spark, sf_dir, "documents")
    staged = docs.select(_tokens(F.col("text")).alias("_toks"))
    toks = F.col("_toks")
    grams = staged.select(
        F.explode(F.when(F.size(toks) >= 3, _ngram_list(toks, 3))).alias("trigram")
    )
    return (
        grams.groupBy("trigram")
        .agg(F.count(F.lit(1)).alias("n_occurrences"))
        .orderBy(F.desc("n_occurrences"), F.asc("trigram"))
        .limit(NGRAM_TOP_K)
    )


_ORACLE_TEXT_NGRAM_TOP = f"""
SELECT trigram, COUNT(*) AS n_occurrences
FROM (SELECT unnest({_sql_ngram_list(_sql_tokens("text"), 3)}) AS trigram
      FROM documents
      WHERE len({_sql_tokens("text")}) >= 3)
GROUP BY trigram
ORDER BY n_occurrences DESC, trigram ASC
LIMIT {NGRAM_TOP_K}
"""


# ---------------------------------------------------------------------------
# Cross-document boilerplate detection (CCNet/C4-style)
# ---------------------------------------------------------------------------

BOILER_MIN_DF = 2  # shingle is boilerplate if it appears in >= this many docs


def q_text_boilerplate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-document boilerplate measurement: the fraction of each doc's
    distinct word-5-gram shingles that also appear in >= BOILER_MIN_DF other
    documents (CCNet/C4 drop repeated headers/footers/navigation by exactly
    this cross-doc frequency signal), rolled up per source.

    Scale shape: ONE explode, then document frequency as a count window
    over the shingle key — the same partitioning trick the Jaccard verify
    stage uses — so the corpus is exploded and shuffled exactly once (the
    first draft materialized the explode twice, once for a DF agg and once
    for a join back: 6.9s → 3.3s at sf0.1). The flag is then a narrow
    comparison and the per-doc rollup one more hash-agg. The per-doc
    fractions are int/int; the per-source mean uses the decimal-exact
    ``davg`` so the cross-engine hash compare is stable.
    """
    from us_flight_bigdata_dashboard_spark.functions.exact import davg
    from us_flight_bigdata_dashboard_spark.operators.dedup import shingles_exploded

    docs = load_table(spark, sf_dir, "documents")
    sh = shingles_exploded(docs, n_words=5, keep=("doc_id", "source"))
    w = Window.partitionBy("shingle")
    per_doc = (
        sh.withColumn("df", F.count(F.lit(1)).over(w))
        .groupBy("doc_id", "source")
        .agg(
            F.count(F.lit(1)).alias("n_shingles"),
            F.sum(F.when(F.col("df") >= BOILER_MIN_DF, 1).otherwise(0)).alias("n_boiler"),
        )
        .withColumn("boiler_frac", F.col("n_boiler") / F.col("n_shingles"))
    )
    return (
        per_doc.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_boiler").alias("total_boiler_shingles"),
            davg("boiler_frac", scale=8).alias("avg_boiler_frac"),
        )
    )


def _sql_boilerplate() -> str:
    from us_flight_bigdata_dashboard_spark.functions.exact import sql_davg
    from us_flight_bigdata_dashboard_spark.operators.dedup import _sql_shingle_list

    return f"""
WITH sh AS (
  SELECT doc_id, source, unnest({_sql_shingle_list(5)}) AS shingle FROM documents
),
boiler AS (
  SELECT shingle FROM sh GROUP BY shingle HAVING COUNT(*) >= {BOILER_MIN_DF}
),
per_doc AS (
  SELECT sh.doc_id, sh.source,
         COUNT(*) AS n_shingles,
         SUM(CASE WHEN b.shingle IS NOT NULL THEN 1 ELSE 0 END) AS n_boiler
  FROM sh LEFT JOIN boiler b ON sh.shingle = b.shingle
  GROUP BY sh.doc_id, sh.source
)
SELECT source,
       COUNT(*) AS n_docs,
       CAST(SUM(n_boiler) AS BIGINT) AS total_boiler_shingles,
       {sql_davg("CAST(n_boiler AS DOUBLE) / n_shingles", scale=8)} AS avg_boiler_frac
FROM per_doc
GROUP BY source
"""



# ---------------------------------------------------------------------------
# Sparse all-pairs cosine similarity (inverted-index join)
# ---------------------------------------------------------------------------

SPARSE_DF_FRAC = 0.10  # stop-term guard: drop terms present in >10% of docs
SPARSE_TOP_PAIRS = 50
_SP_FP = 10**15      # fixed-point scale for order-independent float sums


def q_sparse_allpairs_sim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All-pairs sparse cosine similarity over tf/df term vectors (Bayardo
    et al. 2007, "Scaling Up All Pairs Similarity Search") — the sparse
    complement of the dense embedding near-dup family: document pairs
    scored by the cosine of their term-weight vectors via an
    inverted-index self-join, never a dense n×n product.

    Scale controls, both essential at 100 TB: (1) the DF cap drops
    stop-terms whose posting lists would make the self-join quadratic
    (same guard as the Jaccard verify stage — and since tf/df weights make
    such terms near-worthless anyway, the cap costs almost no recall).
    The cap is RELATIVE (``floor(0.10 · n_docs)``), not absolute: an
    absolute cap silently degenerates to an empty result as the corpus
    grows past the point where every term's posting list exceeds it.
    (2) per-pair accumulation happens on the ALREADY-AGGREGATED (doc,term)
    weight table, so the join input is |distinct doc-term pairs|, not
    corpus tokens. The weight table is deliberately NOT materialized:
    its three consumers (norms + both join sides) end in the SAME
    exchange subtree, which ReusedExchange dedups through shuffle files
    — r3's blanket localCheckpoint conversion regressed this operator
    ~2× (BENCH_r03 1.44s vs r2 0.76s) because the checkpoint replaced
    that shuffle-file reuse with RDD-block scans and dropped the term
    partitioning, re-adding exchanges under the self-join; A/B at sf0.1
    warm: none 1.2-1.3s, persist ~1.4s, localCheckpoint ~1.6s.

    Determinism: per-doc squared norms and per-pair dot products are sums
    of doubles, so each addend is fixed-point quantized (``floor(x ·
    10^15)`` — exact integer sums, no engine rounding-mode sensitivity;
    the PageRank trick) and the final cosine is IEEE ops on deterministic
    values. Top pairs under a (sim, doc_a, doc_b) total order.
    """
    docs = load_table(spark, sf_dir, "documents")
    max_df = int(docs.count() * SPARSE_DF_FRAC)  # parquet metadata count — no scan
    tok = docs.select("doc_id", F.explode(_tokens(F.col("text"))).alias("term"))
    tf = tok.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    df_w = Window.partitionBy("term")
    weights = (
        tf.withColumn("df", F.count(F.lit(1)).over(df_w))
        .filter(F.col("df") <= F.lit(max_df))
        .select("doc_id", "term", (F.col("tf").cast("double") / F.col("df")).alias("w"))
    )
    norms = weights.groupBy("doc_id").agg(
        F.sqrt(
            F.sum(F.floor(F.col("w") * F.col("w") * F.lit(float(_SP_FP))).cast("decimal(38,0)"))
            .cast("double")
            / F.lit(float(_SP_FP))
        ).alias("vnorm")
    )
    a = weights.select(F.col("doc_id").alias("doc_a"), "term", F.col("w").alias("wa"))
    b = weights.select(F.col("doc_id").alias("doc_b"), "term", F.col("w").alias("wb"))
    dots = (
        a.join(b, "term")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(
            (
                F.sum(F.floor(F.col("wa") * F.col("wb") * F.lit(float(_SP_FP))).cast("decimal(38,0)"))
                .cast("double")
                / F.lit(float(_SP_FP))
            ).alias("dot"),
            F.count(F.lit(1)).alias("n_shared_terms"),
        )
    )
    na = norms.select(F.col("doc_id").alias("doc_a"), F.col("vnorm").alias("norm_a"))
    nb = norms.select(F.col("doc_id").alias("doc_b"), F.col("vnorm").alias("norm_b"))
    return (
        dots.join(na, "doc_a")
        .join(nb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            "n_shared_terms",
            (F.col("dot") / (F.col("norm_a") * F.col("norm_b"))).alias("cosine_sim"),
        )
        .orderBy(F.desc("cosine_sim"), F.asc("doc_a"), F.asc("doc_b"))
        .limit(SPARSE_TOP_PAIRS)
    )


_ORACLE_SPARSE_ALLPAIRS = f"""
WITH tok AS (
  SELECT doc_id, unnest({_sql_tokens("text")}) AS term FROM documents
),
tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM tok GROUP BY 1, 2),
weights AS (
  SELECT doc_id, term, CAST(tf AS DOUBLE) / df AS w
  FROM (SELECT doc_id, term, tf, COUNT(*) OVER (PARTITION BY term) AS df FROM tf)
  WHERE df <= (SELECT CAST(floor(COUNT(*) * {SPARSE_DF_FRAC}) AS BIGINT) FROM documents)
),
norms AS (
  SELECT doc_id,
         sqrt(CAST(SUM(CAST(floor(w * w * {float(_SP_FP)}) AS DECIMAL(38,0))) AS DOUBLE)
              / {float(_SP_FP)}) AS vnorm
  FROM weights GROUP BY 1
),
dots AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         CAST(SUM(CAST(floor(a.w * b.w * {float(_SP_FP)}) AS DECIMAL(38,0))) AS DOUBLE)
           / {float(_SP_FP)} AS dot,
         COUNT(*) AS n_shared_terms
  FROM weights a JOIN weights b USING (term)
  WHERE a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT d.doc_a, d.doc_b, d.n_shared_terms,
       d.dot / (na.vnorm * nb.vnorm) AS cosine_sim
FROM dots d
JOIN norms na ON na.doc_id = d.doc_a
JOIN norms nb ON nb.doc_id = d.doc_b
ORDER BY cosine_sim DESC, doc_a ASC, doc_b ASC
LIMIT {SPARSE_TOP_PAIRS}
"""



# ---------------------------------------------------------------------------
# BPE-style pair statistics (tokenizer training substrate)
# ---------------------------------------------------------------------------

BPE_TOP_PAIRS = 20


def q_bpe_pair_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Adjacent character-pair frequencies within words — the statistic one
    BPE merge step maximizes (Sennrich et al. 2016: repeatedly merge the
    most frequent adjacent symbol pair). This is the corpus-scan half of
    tokenizer training; the greedy merge loop itself is a driver-side
    iteration over these counts, re-running this scan per merge (or, in
    practice, over a word-frequency table aggregated once).

    Scale shape: explode words → explode per-word pair arrays (narrow
    array exprs, whole-stage codegen) → one map-side-combined hash-agg
    over the tiny pair domain → top-K under a total order.
    """
    docs = load_table(spark, sf_dir, "documents")
    words = docs.select(F.explode(_tokens(F.col("text"))).alias("word")).filter(
        F.length("word") >= 2
    )
    pairs = words.select(
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.length("word") - 1),
                lambda i: F.col("word").substr(i, F.lit(2)),
            )
        ).alias("pair")
    )
    return (
        pairs.groupBy("pair")
        .agg(F.count(F.lit(1)).alias("n_occurrences"))
        .orderBy(F.desc("n_occurrences"), F.asc("pair"))
        .limit(BPE_TOP_PAIRS)
    )


# ---------------------------------------------------------------------------
# Iterative BPE merge learning (tokenizer training, unrolled rounds)
# ---------------------------------------------------------------------------

BPE_ROUNDS = 3


def _bpe_adjacent_pairs(seg: DataFrame) -> DataFrame:
    """(word, freq, syms) → one row per adjacent symbol pair, freq-weighted."""
    return seg.select(
        "freq",
        F.explode(
            F.when(
                F.size("syms") >= 2,
                F.transform(
                    F.sequence(F.lit(1), F.size("syms") - 1),
                    lambda i: F.struct(
                        F.element_at(F.col("syms"), i.cast("int")).alias("a"),
                        F.element_at(F.col("syms"), (i + 1).cast("int")).alias("b"),
                    ),
                ),
            ).otherwise(F.array().cast("array<struct<a:string,b:string>>"))
        ).alias("p"),
    ).select("freq", "p.a", "p.b")


def _bpe_top_pair(pairs: DataFrame) -> DataFrame:
    """Highest-weight pair under a deterministic total order (1 row)."""
    return (
        pairs.groupBy("a", "b")
        .agg(F.sum("freq").alias("pair_count"))
        .orderBy(F.desc("pair_count"), F.asc("a"), F.asc("b"))
        .limit(1)
    )


def _bpe_apply_merge(seg: DataFrame, top: DataFrame) -> DataFrame:
    """Greedy left-to-right application of ONE merge rule (pa, pb) to every
    word's symbol array, as a per-row ``aggregate`` fold: walk the symbols,
    and when the accumulator's last element is pa and the next symbol is
    pb, replace the last element with pa||pb (a merged element never
    re-merges within the same rule, matching canonical BPE)."""
    with_rule = seg.crossJoin(F.broadcast(top.select(F.col("a").alias("_pa"), F.col("b").alias("_pb"))))
    fold = F.aggregate(
        F.col("syms"),
        F.array().cast("array<string>"),
        lambda acc, s: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.col("_pa"))
            & (s == F.col("_pb")),
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1),
                F.array(F.concat(F.col("_pa"), F.col("_pb"))),
            ),
        ).otherwise(F.concat(acc, F.array(s))),
    )
    return with_rule.select("word", "freq", fold.alias("syms"))


def q_bpe_learn_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE tokenizer TRAINING, not just its statistic: {BPE_ROUNDS} merge
    rounds unrolled into one lazy plan (Sennrich et al. 2016). Round k
    counts adjacent symbol pairs over the current segmentation weighted by
    word frequency, picks the max under a deterministic total order
    (count desc, pair asc), and re-segments every word by applying that
    merge greedily left-to-right. Output: one row per learned merge.

    This is the iterative-algorithm pattern (like PageRank) applied to
    vocabulary learning: the driver unrolls a FIXED number of rounds into
    the plan — no data-dependent driver loop, no collect between rounds —
    so the oracle can mirror the exact computation with unrolled CTEs
    (the re-segment fold is `list_reduce` with a separator-string
    accumulator on the DuckDB side; both folds implement the same
    left-to-right merge recurrence and are exact on strings).

    Scale shape: training runs on the (word, freq) VOCABULARY — one
    corpus-sized explode + hash-agg, after which every round touches only
    |vocab| rows (≪ corpus; Zipf makes vocabulary sublinear in corpus
    size). Per round: one narrow pair explode, one map-side-combined
    hash-agg over the tiny pair domain, a 1-row top-1, and a broadcast
    crossJoin + per-row fold — zero row-proportional shuffles beyond the
    pair agg. At 100 TB the corpus scan happens once; the loop cost is
    independent of corpus size."""
    docs = load_table(spark, sf_dir, "documents")
    vocab = (
        docs.select(F.explode(_tokens(F.col("text"))).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    seg = vocab.select(
        "word",
        "freq",
        F.transform(
            F.sequence(F.lit(1), F.length("word")),
            lambda i: F.col("word").substr(i.cast("int"), F.lit(1)),
        ).alias("syms"),
    )
    learned = []
    for rnd in range(1, BPE_ROUNDS + 1):
        top = _bpe_top_pair(_bpe_adjacent_pairs(seg))
        learned.append(
            top.select(
                F.lit(rnd).alias("round"),
                F.col("a").alias("pair_a"),
                F.col("b").alias("pair_b"),
                F.concat("a", "b").alias("merged"),
                "pair_count",
            )
        )
        if rnd < BPE_ROUNDS:
            seg = _bpe_apply_merge(seg, top)
    out = learned[0]
    for df in learned[1:]:
        out = out.unionByName(df)
    return out


def _sql_bpe_learn_merges() -> str:
    """Unrolled-CTE oracle. The re-segment fold uses `list_reduce` with a
    chr(1)-separated string accumulator: merging appends pb directly onto
    an accumulator ending in (sep ||) pa — same greedy left-to-right
    recurrence as the Spark array fold."""
    sep = "chr(1)"
    parts = [
        f"""toks AS (
  SELECT unnest({_sql_tokens("text")}) AS word FROM documents
), vocab AS (
  SELECT word, COUNT(*) AS freq FROM toks GROUP BY 1
), seg1 AS (
  SELECT word, freq,
         list_transform(generate_series(1, len(word)),
                        i -> substr(word, CAST(i AS INTEGER), 1)) AS syms
  FROM vocab
)"""
    ]
    for k in range(1, BPE_ROUNDS + 1):
        parts.append(
            f"""pairs{k} AS (
  SELECT seg.freq, p.a, p.b
  FROM seg{k} seg,
       unnest(CASE WHEN len(seg.syms) >= 2
                   THEN list_transform(generate_series(1, len(seg.syms) - 1),
                                       i -> {{'a': seg.syms[i], 'b': seg.syms[i + 1]}})
                   ELSE [] END) AS t(p)
), top{k} AS (
  SELECT a, b, CAST(SUM(freq) AS BIGINT) AS pair_count
  FROM pairs{k} GROUP BY a, b
  ORDER BY pair_count DESC, a ASC, b ASC LIMIT 1
)"""
        )
        if k < BPE_ROUNDS:
            parts.append(
                f"""seg{k + 1} AS (
  SELECT seg.word, seg.freq,
         string_split(list_reduce(seg.syms, (acc, s) ->
           CASE WHEN (acc = t.a OR ends_with(acc, {sep} || t.a)) AND s = t.b
                THEN acc || s
                ELSE acc || {sep} || s END), {sep}) AS syms
  FROM seg{k} seg CROSS JOIN top{k} t
)"""
            )
    selects = " UNION ALL ".join(
        f"SELECT {k} AS round, a AS pair_a, b AS pair_b, a || b AS merged, pair_count FROM top{k}"
        for k in range(1, BPE_ROUNDS + 1)
    )
    return "WITH " + ",\n".join(parts) + "\n" + selects


_ORACLE_BPE_PAIR_COUNTS = f"""
SELECT pair, COUNT(*) AS n_occurrences
FROM (
  SELECT unnest(list_transform(generate_series(1, length(word) - 1),
                               i -> substr(word, i, 2))) AS pair
  FROM (SELECT unnest({_sql_tokens("text")}) AS word FROM documents)
  WHERE length(word) >= 2
)
GROUP BY pair
ORDER BY n_occurrences DESC, pair ASC
LIMIT {BPE_TOP_PAIRS}
"""


# ---------------------------------------------------------------------------
# Term co-occurrence lift (word-association statistics)
# ---------------------------------------------------------------------------

COOC_WINDOW = 2     # max token distance for a co-occurrence
COOC_MIN_PAIR = 5   # min pair support
COOC_TOP = 20


def q_cooccur_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Windowed term co-occurrence with lift scoring — the PMI-family
    association statistic behind collocation mining and word-vector count
    matrices. Lift = P(a,b) / (P(a)·P(b)) computed as
    ``n_pair · n_positions / (n_a · n_b)``; the log is deliberately NOT
    taken (``ln`` is not correctly-rounded across engines; the ranking is
    monotone in lift anyway).

    Scale shape: positions explode once; the ±{COOC_WINDOW} proximity join
    is a UNION of {COOC_WINDOW} EQUI-joins on (doc_id, pos + k) — never a
    non-equi range self-join — so each candidate pair is produced exactly
    once per offset and the join keys shuffle-partition cleanly. Unigram
    counts broadcast back onto the aggregated pair table. The position
    table is materialized once (eager localCheckpoint): it has
    2·{COOC_WINDOW}+2 consumers (offset join
    sides, unigram agg, total count) that would otherwise each re-run the
    tokenize + posexplode scan.
    """
    docs = load_table(spark, sf_dir, "documents")
    pos = docs.select(
        "doc_id", F.posexplode(_tokens(F.col("text"))).alias("pos", "term")
    ).localCheckpoint(eager=True)
    uni = pos.groupBy("term").agg(F.count(F.lit(1)).alias("n_term"))
    n_positions = pos.count()
    parts = []
    for k in range(1, COOC_WINDOW + 1):
        a = pos.select("doc_id", F.col("pos").alias("pa"), F.col("term").alias("ta"))
        b = pos.select(
            "doc_id", (F.col("pos") - k).alias("pa"), F.col("term").alias("tb")
        )
        parts.append(
            a.join(b, ["doc_id", "pa"]).select(
                F.least("ta", "tb").alias("term_a"), F.greatest("ta", "tb").alias("term_b")
            )
        )
    pairs = parts[0]
    for extra in parts[1:]:
        pairs = pairs.unionAll(extra)
    counted = (
        pairs.filter(F.col("term_a") != F.col("term_b"))
        .groupBy("term_a", "term_b")
        .agg(F.count(F.lit(1)).alias("n_pair"))
        .filter(F.col("n_pair") >= COOC_MIN_PAIR)
    )
    ua = uni.select(F.col("term").alias("term_a"), F.col("n_term").alias("n_a"))
    ub = uni.select(F.col("term").alias("term_b"), F.col("n_term").alias("n_b"))
    return (
        counted.join(F.broadcast(ua), "term_a")
        .join(F.broadcast(ub), "term_b")
        .select(
            "term_a",
            "term_b",
            "n_pair",
            (
                (F.col("n_pair").cast("double") * F.lit(float(n_positions)))
                / (F.col("n_a") * F.col("n_b"))
            ).alias("lift"),
        )
        .orderBy(F.desc("lift"), F.asc("term_a"), F.asc("term_b"))
        .limit(COOC_TOP)
    )


def _sql_cooccur_lift() -> str:
    offset_joins = " UNION ALL ".join(
        f"""SELECT a.doc_id, least(a.term, b.term) AS term_a, greatest(a.term, b.term) AS term_b
  FROM pos a JOIN pos b ON a.doc_id = b.doc_id AND b.pos = a.pos + {k}"""
        for k in range(1, COOC_WINDOW + 1)
    )
    return f"""
WITH pos AS (
  SELECT doc_id, u.term AS term, u.pos AS pos FROM (
    SELECT doc_id,
           unnest(list_transform(generate_series(1, len(toks)),
                                 i -> struct_pack(pos := CAST(i - 1 AS BIGINT), term := toks[i]))) AS u
    FROM (SELECT doc_id, {_sql_tokens("text")} AS toks FROM documents)
  )
),
uni AS (SELECT term, COUNT(*) AS n_term FROM pos GROUP BY 1),
total AS (SELECT COUNT(*) AS n_positions FROM pos),
pairs AS ({offset_joins}),
counted AS (
  SELECT term_a, term_b, COUNT(*) AS n_pair
  FROM pairs WHERE term_a <> term_b
  GROUP BY 1, 2
  HAVING COUNT(*) >= {COOC_MIN_PAIR}
)
SELECT c.term_a, c.term_b, c.n_pair,
       (CAST(c.n_pair AS DOUBLE) * CAST(t.n_positions AS DOUBLE)) / (ua.n_term * ub.n_term) AS lift
FROM counted c
JOIN uni ua ON ua.term = c.term_a
JOIN uni ub ON ub.term = c.term_b
CROSS JOIN total t
ORDER BY lift DESC, term_a ASC, term_b ASC
LIMIT {COOC_TOP}
"""


# ---------------------------------------------------------------------------
# Rarity score (rank-based perplexity proxy)
# ---------------------------------------------------------------------------

RARITY_TOP_DOCS = 30


def q_text_rarity_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document rarity score: the mean corpus-frequency RANK of a
    document's tokens — the quality-filter proxy for "this text is full of
    tokens the corpus rarely produces" (CCNet uses LM perplexity for the
    same purpose; a rank statistic gives the same ordering signal without
    ``ln``, which is deliberately banned in this engine because engines
    are not required to round transcendentals identically and the exact
    gate would become a coin flip).

    Scale shape: one explode feeds BOTH the corpus count (hash-agg) and
    the per-doc join; ranks come from one window over the vocab-sized
    count table (tiny next to the corpus); the token→rank join shuffles
    on term — at 100 TB this is the standard vocab-join, co-partitioned
    with the counting agg. Determinism: ranks are dense integers with a
    total tie-break (count desc, term asc); the per-doc mean is the exact
    decimal construction. Top {RARITY_TOP_DOCS} rarest docs under a total
    order.
    """
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id", F.explode(_tokens(F.col("text"))).alias("term")
    ).localCheckpoint(eager=True)
    counts = tok.groupBy("term").agg(F.count(F.lit(1)).alias("n"))
    # (n, term) is unique per row, so dense_rank == row_number == the
    # _cum_prev bucketed rank over (-n, term) — no single-task
    # vocabulary-sized window (r14 optimization). Local import: statistics
    # imports dedup which imports this module (cycle at module level).
    from us_flight_bigdata_dashboard_spark.operators.statistics import _cum_prev

    ranks = _cum_prev(
        counts.withColumn("_negn", -F.col("n")),
        ["_negn", "term"],
        {"_rp": F.lit(1)},
        materialize=True,
    ).select("term", (F.col("_rp") + F.lit(1)).alias("term_rank"))
    return (
        tok.join(ranks, "term")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            davg(F.col("term_rank").cast("double"), scale=4).alias("mean_term_rank"),
        )
        .orderBy(F.desc("mean_term_rank"), F.asc("doc_id"))
        .limit(RARITY_TOP_DOCS)
    )


_ORACLE_TEXT_RARITY = f"""
WITH tok AS (
  SELECT doc_id, unnest({_sql_tokens("text")}) AS term FROM documents
),
counts AS (SELECT term, COUNT(*) AS n FROM tok GROUP BY 1),
ranks AS (
  SELECT term, DENSE_RANK() OVER (ORDER BY n DESC, term ASC) AS term_rank
  FROM counts
)
SELECT t.doc_id, COUNT(*) AS n_tokens,
       {sql_davg("CAST(term_rank AS DOUBLE)", scale=4)} AS mean_term_rank
FROM tok t JOIN ranks r USING (term)
GROUP BY t.doc_id
ORDER BY mean_term_rank DESC, doc_id ASC
LIMIT {RARITY_TOP_DOCS}
"""


# ---------------------------------------------------------------------------
# BM25 relevance ranking
# ---------------------------------------------------------------------------

BM25_TERMS = ["spark", "vector", "stream"]  # fixed query, mid-df corpus terms
BM25_TOPK = 15
# k1=1.2, b=0.75 (standard Okapi constants). The literals below are the
# *derived* constants written out — 2.2 = k1+1, 0.25 = 1-b — so both engines
# parse the same decimal literal instead of re-deriving it in float.


def _term_tf(toks, word: str):
    return F.size(F.filter(toks, lambda t: t == F.lit(word)))


def q_text_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Okapi BM25 ranking of the corpus against the fixed query
    ``BM25_TERMS``, top-``BM25_TOPK`` documents.

    Determinism contract (hash-exact vs DuckDB): the classic
    ``ln((N-df+0.5)/(df+0.5))`` idf is replaced by the *rational odds*
    ``(N-df+0.5)/(df+0.5)`` itself — ``ln`` is monotone, so per-term
    ranking is unchanged, and unlike ``ln`` (not correctly rounded across
    engines) every op here (+,*,/) is exactly rounded IEEE, so identical
    operand order ⇒ bit-identical doubles. The Spark expression and the
    oracle SQL pin the same left-associated order.

    Scale shape: ZERO explodes and ZERO data joins. Per-doc tf for the
    3 query terms and dl are narrow array expressions over the tokens
    (one scan, whole-stage codegen); corpus stats (N, Σdl, per-term df)
    are ONE global agg producing a single row, broadcast back with a
    crossJoin (no driver collect); scoring is a narrow projection; the
    final top-k is TakeOrdered (orderBy+limit — distributed heap, no
    global sort shuffle), with row_number applied on the ≤K survivors.
    At 100 TB this is one scan + one scalar agg + one top-k."""
    docs = load_table(spark, sf_dir, "documents")
    staged = docs.select("doc_id", _tokens(F.col("text")).alias("_toks"))
    toks = F.col("_toks")
    per = staged.select(
        "doc_id",
        F.size(toks).alias("dl"),
        *[_term_tf(toks, w).alias(f"tf{i}") for i, w in enumerate(BM25_TERMS)],
    )
    stats = per.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("dl").alias("sum_dl"),
        *[
            F.sum((F.col(f"tf{i}") > 0).cast("long")).alias(f"df{i}")
            for i in range(len(BM25_TERMS))
        ],
    ).select(
        (F.col("sum_dl").cast("double") / F.col("n_docs")).alias("avgdl"),
        *[
            (
                ((F.col("n_docs") - F.col(f"df{i}")).cast("double") + F.lit(0.5))
                / (F.col(f"df{i}").cast("double") + F.lit(0.5))
            ).alias(f"idf{i}")
            for i in range(len(BM25_TERMS))
        ],
    )

    def _s(i: int):
        tfd = F.col(f"tf{i}").cast("double")
        denom = tfd + F.lit(1.2) * (
            F.lit(0.25) + F.lit(0.75) * (F.col("dl").cast("double") / F.col("avgdl"))
        )
        return F.col(f"idf{i}") * ((tfd * F.lit(2.2)) / denom)

    score = _s(0) + _s(1) + _s(2)
    scored = (
        per.crossJoin(F.broadcast(stats))
        .filter((F.col("tf0") + F.col("tf1") + F.col("tf2")) > 0)
        .select(
            "doc_id",
            "dl",
            F.col("tf0").alias("tf_spark"),
            F.col("tf1").alias("tf_vector"),
            F.col("tf2").alias("tf_stream"),
            score.alias("score"),
        )
    )
    top = scored.orderBy(F.col("score").desc(), F.col("doc_id").asc()).limit(BM25_TOPK)
    w = Window.orderBy(F.col("score").desc(), F.col("doc_id").asc())
    return top.withColumn("rk", F.row_number().over(w))


def _sql_bm25() -> str:
    tf_cols = ",\n         ".join(
        f"CAST(len(list_filter(toks, t -> t = '{w}')) AS INTEGER) AS tf{i}"
        for i, w in enumerate(BM25_TERMS)
    )
    df_cols = ",\n         ".join(
        f"SUM(CASE WHEN tf{i} > 0 THEN 1 ELSE 0 END) AS df{i}"
        for i in range(len(BM25_TERMS))
    )
    idf_cols = ",\n         ".join(
        f"(CAST(n_docs - df{i} AS DOUBLE) + 0.5) / (CAST(df{i} AS DOUBLE) + 0.5) AS idf{i}"
        for i in range(len(BM25_TERMS))
    )
    s_terms = " + ".join(
        f"(idf{i} * ((CAST(tf{i} AS DOUBLE) * 2.2) / "
        f"(CAST(tf{i} AS DOUBLE) + 1.2 * (0.25 + 0.75 * (CAST(dl AS DOUBLE) / avgdl)))))"
        for i in range(len(BM25_TERMS))
    )
    return f"""
WITH per AS (
  SELECT doc_id,
         CAST(len(toks) AS INTEGER) AS dl,
         {tf_cols}
  FROM (SELECT doc_id, {_sql_tokens("text")} AS toks FROM documents)
), stats AS (
  SELECT CAST(sum_dl AS DOUBLE) / n_docs AS avgdl,
         {idf_cols}
  FROM (SELECT COUNT(*) AS n_docs, SUM(dl) AS sum_dl,
         {df_cols}
        FROM per) raw
), scored AS (
  SELECT doc_id, dl, tf0 AS tf_spark, tf1 AS tf_vector, tf2 AS tf_stream,
         {s_terms} AS score
  FROM per CROSS JOIN stats
  WHERE tf0 + tf1 + tf2 > 0
)
SELECT doc_id, dl, tf_spark, tf_vector, tf_stream, score, rk
FROM (SELECT *, ROW_NUMBER() OVER (ORDER BY score DESC, doc_id ASC) AS rk
      FROM scored)
WHERE rk <= {BM25_TOPK}
"""


# ---------------------------------------------------------------------------
# Overlapping token-window chunking (RAG / context-window preparation)
# ---------------------------------------------------------------------------

RAG_CHUNK_TOKENS = 16  # window length (config; small so testdata docs multi-chunk)
RAG_CHUNK_STRIDE = 12  # window start step (overlap = 16 - 12 = 4 tokens)


def q_text_chunk_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window document chunking with overlap — the retrieval /
    context-window preparation step (RAG indexing, long-doc training
    sample construction): windows of {RAG_CHUNK_TOKENS} tokens starting
    every {RAG_CHUNK_STRIDE}, so consecutive chunks share
    {RAG_CHUNK_TOKENS - RAG_CHUNK_STRIDE} boundary tokens and no sentence
    straddles a hard cut. Unlike ``dedup_chunks`` (disjoint hash units),
    these windows overlap and carry their text + offsets.

    Window rule: starts = 1, 1+stride, … ≤ max(n − window + stride, 1) —
    the stop bound is window−stride PAST the last full-window start, so
    when a full window can't reach the final token a SHORT tail window is
    emitted that does (a chunker that silently drops up to stride−1 tail
    tokens loses data; caught by the tiling property test). Documents
    shorter than one window yield exactly one chunk. chunk_idx =
    (start − 1) / stride — pure integer arithmetic, no positional explode
    needed.

    Scale shape: tokenize is staged behind a projection boundary (see
    dedup.shingles_exploded), then ONE narrow explode of the start
    sequence with per-row slices — zero joins, zero shuffles; chunking
    parallelizes embarrassingly over documents."""
    docs = load_table(spark, sf_dir, "documents")
    staged = docs.select("doc_id", _tokens(F.col("text")).alias("_toks"))
    toks = F.col("_toks")
    n = F.size(toks)
    starts = F.sequence(
        F.lit(1),
        F.greatest(n - F.lit(RAG_CHUNK_TOKENS - RAG_CHUNK_STRIDE), F.lit(1)),
        F.lit(RAG_CHUNK_STRIDE),
    )
    exploded = staged.select(
        "doc_id", "_toks", n.alias("n_tokens"), F.explode(starts).alias("start_token")
    )
    return exploded.select(
        "doc_id",
        ((F.col("start_token") - 1) / RAG_CHUNK_STRIDE).cast("int").alias("chunk_idx"),
        "start_token",
        F.least(
            F.lit(RAG_CHUNK_TOKENS), F.col("n_tokens") - F.col("start_token") + 1
        ).alias("chunk_len"),
        F.concat_ws(
            " ", F.slice(toks, F.col("start_token"), F.lit(RAG_CHUNK_TOKENS))
        ).alias("chunk_text"),
    )


_ORACLE_TEXT_CHUNK_OVERLAP = f"""
WITH t AS (
  SELECT doc_id, {_sql_tokens("text")} AS toks FROM documents
), s AS (
  SELECT doc_id, toks, len(toks) AS n,
         unnest(generate_series(1, greatest(len(toks) - {RAG_CHUNK_TOKENS - RAG_CHUNK_STRIDE}, 1),
                                {RAG_CHUNK_STRIDE})) AS start_token
  FROM t
)
SELECT doc_id,
       CAST((start_token - 1) / {RAG_CHUNK_STRIDE} AS INTEGER) AS chunk_idx,
       start_token,
       CAST(least({RAG_CHUNK_TOKENS}, n - start_token + 1) AS INTEGER) AS chunk_len,
       array_to_string(toks[start_token : start_token + {RAG_CHUNK_TOKENS - 1}], ' ')
         AS chunk_text
FROM s
"""


# ---------------------------------------------------------------------------
# N-gram novelty (incremental-corpus freshness signal)
# ---------------------------------------------------------------------------

NOVELTY_N = 3


def q_text_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document novelty: the fraction of a document's distinct
    {NOVELTY_N}-gram shingles whose FIRST corpus occurrence (by doc_id
    order) is this document — the freshness signal an incremental crawl
    pipeline uses to decide whether a new batch still adds content or is
    re-crawling the same material (novelty ≈ 0 → stop).

    Plan: shingles explode once; first-occurrence owner per shingle is
    one min-aggregate on the shingle key; the per-doc novel count joins
    the (doc, shingle) pairs back to that map on the SAME shingle key —
    the join reuses the aggregation's partitioning — and the final
    per-doc rollup is integer counts + one exact division. Shingle-key
    shuffles only; no pairwise comparison anywhere."""
    docs = load_table(spark, sf_dir, "documents")
    toks = _tokens(F.col("text"))
    n_sh = F.size(toks) - (NOVELTY_N - 1)
    # Guard: sequence(1, 0) descends to [1, 0] in Spark (default step −1)
    # and slice(toks, 0, n) then throws — a doc with < NOVELTY_N tokens
    # must yield an EMPTY shingle array (dropping the doc, exactly like
    # DuckDB's empty generate_series(1, 0)). Same shape as dedup.py's
    # short-document guard.
    shingles = docs.select(
        "doc_id",
        F.explode(
            F.when(
                n_sh >= 1,
                F.transform(
                    F.sequence(F.lit(1), n_sh),
                    lambda i: F.concat_ws(" ", F.slice(toks, i, NOVELTY_N)),
                ),
            ).otherwise(F.array().cast("array<string>"))
        ).alias("shingle"),
    ).distinct()
    first_owner = shingles.groupBy("shingle").agg(
        F.min("doc_id").alias("first_doc")
    )
    return (
        shingles.join(first_owner, "shingle")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_shingles"),
            F.sum(
                F.when(F.col("doc_id") == F.col("first_doc"), 1).otherwise(0)
            ).alias("n_novel"),
            (
                F.sum(
                    F.when(F.col("doc_id") == F.col("first_doc"), 1).otherwise(0)
                ).cast("double")
                / F.count(F.lit(1))
            ).alias("novelty"),
        )
        .orderBy("doc_id")
    )


_ORACLE_TEXT_NGRAM_NOVELTY = f"""
WITH t AS (
  SELECT doc_id, {_sql_tokens("text")} AS toks FROM documents
), shingles AS (
  SELECT DISTINCT doc_id,
         array_to_string(toks[i : i + {NOVELTY_N - 1}], ' ') AS shingle
  FROM t, unnest(generate_series(1, greatest(len(toks) - {NOVELTY_N - 1}, 0))) AS s(i)
), first_owner AS (
  SELECT shingle, MIN(doc_id) AS first_doc FROM shingles GROUP BY shingle
)
SELECT doc_id,
       COUNT(*) AS n_shingles,
       CAST(SUM(CASE WHEN doc_id = first_doc THEN 1 ELSE 0 END) AS BIGINT) AS n_novel,
       CAST(SUM(CASE WHEN doc_id = first_doc THEN 1 ELSE 0 END) AS DOUBLE)
         / COUNT(*) AS novelty
FROM shingles JOIN first_owner USING (shingle)
GROUP BY doc_id
ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# Vocabulary growth curve (Heaps' law profile, first-occurrence bucketing)
# ---------------------------------------------------------------------------

VOCAB_GROWTH_BUCKETS = 10


def q_vocab_growth_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heaps'-law profile: cumulative distinct vocabulary versus cumulative
    token volume as the corpus grows in doc_id order, at
    {VOCAB_GROWTH_BUCKETS} corpus checkpoints — the curve that says
    whether more data still buys vocabulary coverage.

    The naive formulation re-counts distinct tokens per checkpoint
    ({VOCAB_GROWTH_BUCKETS} full distinct-aggregations); this one uses
    the first-occurrence trick — each token type contributes to exactly
    the bucket where its MIN doc_id falls — so ONE distinct-aggregation
    plus a {VOCAB_GROWTH_BUCKETS}-row running sum produces the whole
    curve. Buckets are doc-id ranges (ntile over the doc domain would
    also do; fixed ranges keep the oracle trivial). All integers; the
    running sums run over {VOCAB_GROWTH_BUCKETS} rows."""
    docs = load_table(spark, sf_dir, "documents")
    max_doc = docs.agg((F.max("doc_id") + 1).alias("n_docs"))
    toks = docs.select("doc_id", F.explode(_tokens(F.col("text"))).alias("tok"))
    # integer floor-div on BOTH engines (double division + truncation can
    # disagree when the quotient lands on an integer boundary)
    bucket = lambda c: F.expr(  # noqa: E731
        f"least({VOCAB_GROWTH_BUCKETS - 1}, ({c} * {VOCAB_GROWTH_BUCKETS}) div n_docs)"
    )
    first_occ = (
        toks.groupBy("tok").agg(F.min("doc_id").alias("first_doc"))
        .crossJoin(F.broadcast(max_doc))
        .groupBy(bucket("first_doc").alias("bucket"))
        .agg(F.count(F.lit(1)).alias("new_types"))
    )
    tok_vol = (
        toks.crossJoin(F.broadcast(max_doc))
        .groupBy(bucket("doc_id").alias("bucket"))
        .agg(F.count(F.lit(1)).alias("bucket_tokens"))
    )
    w = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, 0)
    return (
        tok_vol.join(first_occ, "bucket", "left")
        .select(
            "bucket",
            "bucket_tokens",
            F.coalesce(F.col("new_types"), F.lit(0)).alias("new_types"),
        )
        .withColumn("cum_tokens", F.sum("bucket_tokens").over(w))
        .withColumn("cum_vocab", F.sum("new_types").over(w))
        .orderBy("bucket")
    )


_ORACLE_VOCAB_GROWTH_CURVE = f"""
WITH nd AS (SELECT MAX(doc_id) + 1 AS n_docs FROM documents),
toks AS (
  SELECT doc_id, unnest({_sql_tokens("text")}) AS tok FROM documents
), first_occ AS (
  SELECT CAST(least({VOCAB_GROWTH_BUCKETS - 1},
                    (first_doc * {VOCAB_GROWTH_BUCKETS}) // n_docs) AS BIGINT) AS bucket,
         COUNT(*) AS new_types
  FROM (SELECT tok, MIN(doc_id) AS first_doc FROM toks GROUP BY tok), nd
  GROUP BY 1
), tok_vol AS (
  SELECT CAST(least({VOCAB_GROWTH_BUCKETS - 1},
                    (doc_id * {VOCAB_GROWTH_BUCKETS}) // n_docs) AS BIGINT) AS bucket,
         COUNT(*) AS bucket_tokens
  FROM toks, nd
  GROUP BY 1
)
SELECT bucket, bucket_tokens,
       COALESCE(new_types, 0) AS new_types,
       CAST(SUM(bucket_tokens) OVER (ORDER BY bucket ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_tokens,
       CAST(SUM(COALESCE(new_types, 0)) OVER (ORDER BY bucket ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_vocab
FROM tok_vol LEFT JOIN first_occ USING (bucket)
ORDER BY bucket
"""



def q_text_langid_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The eval-harness reduction over the language-ID predictions: a
    (true lang × predicted lang) confusion matrix with each cell's share
    of its true-language row — the per-class recall diagonal and the
    error structure off it. This is the standard acceptance gate before
    trusting any heuristic classifier's output as a training-data filter:
    accuracy alone hides which languages bleed into which.

    Plan: the per-doc prediction pipeline (one scan, stack-unpivot,
    per-doc argmax window) reduced by ONE tiny hash agg keyed on the
    (true, pred) pair — |langs|² cells, so everything after the scan is
    bytes. share = cell / true-language total via a window over the cell
    table (≤ dozens of rows)."""
    preds = q_text_langid(spark, sf_dir)
    cells = preds.groupBy("lang_meta", "pred_lang").agg(
        F.count(F.lit(1)).alias("n")
    )
    w = Window.partitionBy("lang_meta")
    return (
        cells.withColumn(
            "share_of_true",
            F.col("n").cast("double") / F.sum("n").over(w).cast("double"),
        )
        .orderBy("lang_meta", "pred_lang")
    )


def _sql_langid_confusion() -> str:
    return f"""
WITH preds AS ({_sql_langid()}),
cells AS (
  SELECT lang_meta, pred_lang, COUNT(*) AS n
  FROM preds GROUP BY 1, 2
)
SELECT lang_meta, pred_lang, CAST(n AS BIGINT) AS n,
       CAST(n AS DOUBLE)
         / CAST(SUM(n) OVER (PARTITION BY lang_meta) AS DOUBLE) AS share_of_true
FROM cells
ORDER BY lang_meta, pred_lang
"""


# ---------------------------------------------------------------------------
# Hybrid retrieval: reciprocal-rank fusion of BM25 and embedding cosine
# ---------------------------------------------------------------------------

RRF_K = 60  # the standard RRF damping constant (Cormack et al. 2009)
RRF_LIST_K = 20  # depth of the dense (cosine) candidate list
RRF_QUERY_VEC = 0  # fixed dense query: the embedding of vec_id 0
RRF_TOPK = 15  # fused result size


def q_retrieval_rrf_fusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval via reciprocal-rank fusion: the lexical BM25
    ranking (``text_bm25_topk``'s fixed-term query) fused with a dense
    embedding-cosine ranking (query = vector {RRF_QUERY_VEC}) by
    RRF(d) = Σ_lists 1/({RRF_K} + rank_list(d)) — the standard
    score-free way to combine sparse and dense retrievers (Cormack et
    al. 2009), and the join shape every RAG indexing pipeline runs.

    Determinism: ranks are integers under a total order (score DESC,
    doc_id ASC); each 1/({RRF_K}+r) is one correctly-rounded IEEE
    division and the fusion adds exactly two such terms in fixed written
    order, so scores are bit-identical across engines. Scale shape: both
    candidate lists are TakeOrdered top-k (distributed heap, no global
    sort shuffle), the fusion is a full-outer join of two ≤k-row lists —
    the fused stage costs nothing at any corpus size; the dense side's
    scan is the brute-force baseline that an IVF/LSH index
    (``ann_ivf``/``ann_lsh``) replaces at 100 TB."""
    from us_flight_bigdata_dashboard_spark.operators.similarity import _dot, _norm

    bm25 = q_text_bm25_topk(spark, sf_dir).select(
        "doc_id", F.col("rk").alias("bm25_rank")
    )
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") == RRF_QUERY_VEC).select(
        F.col("embedding").alias("q_emb")
    )
    cos = (
        emb.filter(F.col("vec_id") != RRF_QUERY_VEC)
        .crossJoin(F.broadcast(q))
        .select(
            F.col("vec_id").alias("doc_id"),
            (
                _dot(F.col("embedding"), F.col("q_emb"))
                / (_norm(F.col("embedding")) * _norm(F.col("q_emb")))
            ).alias("cos_sim"),
        )
    )
    cos_top = cos.orderBy(F.col("cos_sim").desc(), F.col("doc_id").asc()).limit(
        RRF_LIST_K
    )
    w_cos = Window.orderBy(F.col("cos_sim").desc(), F.col("doc_id").asc())
    cos_ranked = cos_top.withColumn("cos_rank", F.row_number().over(w_cos)).select(
        "doc_id", "cos_rank"
    )
    k = float(RRF_K)
    fused = bm25.join(cos_ranked, "doc_id", "full_outer").select(
        "doc_id",
        "bm25_rank",
        "cos_rank",
        (
            F.coalesce(
                F.lit(1.0) / (F.lit(k) + F.col("bm25_rank").cast("double")), F.lit(0.0)
            )
            + F.coalesce(
                F.lit(1.0) / (F.lit(k) + F.col("cos_rank").cast("double")), F.lit(0.0)
            )
        ).alias("rrf_score"),
    )
    top = fused.orderBy(F.col("rrf_score").desc(), F.col("doc_id").asc()).limit(
        RRF_TOPK
    )
    w_f = Window.orderBy(F.col("rrf_score").desc(), F.col("doc_id").asc())
    return top.withColumn("fused_rank", F.row_number().over(w_f))


def _sql_rrf_fusion() -> str:
    from us_flight_bigdata_dashboard_spark.operators.similarity import _sql_cosine

    cos = _sql_cosine("c.embedding", "q.embedding")
    k = float(RRF_K)
    return f"""
WITH bm25_full AS ({_sql_bm25()}),
bm25 AS (SELECT doc_id, CAST(rk AS INTEGER) AS bm25_rank FROM bm25_full),
cosq AS (
  SELECT c.vec_id AS doc_id, {cos} AS cos_sim
  FROM embeddings c,
       (SELECT embedding FROM embeddings WHERE vec_id = {RRF_QUERY_VEC}) q
  WHERE c.vec_id <> {RRF_QUERY_VEC}
), cos_ranked AS (
  SELECT doc_id, CAST(rn AS INTEGER) AS cos_rank
  FROM (SELECT doc_id,
               ROW_NUMBER() OVER (ORDER BY cos_sim DESC, doc_id ASC) AS rn
        FROM cosq)
  WHERE rn <= {RRF_LIST_K}
), fused AS (
  SELECT COALESCE(b.doc_id, c.doc_id) AS doc_id,
         b.bm25_rank, c.cos_rank,
         COALESCE(1.0 / ({k} + CAST(b.bm25_rank AS DOUBLE)), 0.0)
           + COALESCE(1.0 / ({k} + CAST(c.cos_rank AS DOUBLE)), 0.0) AS rrf_score
  FROM bm25 b FULL OUTER JOIN cos_ranked c ON b.doc_id = c.doc_id
)
SELECT doc_id, bm25_rank, cos_rank, rrf_score,
       CAST(fused_rank AS INTEGER) AS fused_rank
FROM (SELECT *, ROW_NUMBER() OVER (ORDER BY rrf_score DESC, doc_id ASC) AS fused_rank
      FROM fused)
WHERE fused_rank <= {RRF_TOPK}
"""


# ---------------------------------------------------------------------------
# RAKE keyword extraction (phrase candidates between stopword breakers)
# ---------------------------------------------------------------------------

RAKE_STOPS = [
    "the", "a", "an", "of", "and", "to", "is", "in", "that", "it",
    "on", "for", "with", "as", "was", "at", "by", "be", "this", "are",
]
RAKE_MAX_PHRASE = 4  # longest candidate phrase (words)
RAKE_TOPK = 3  # keywords kept per document


def q_text_rake_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RAKE keyword extraction (Rose et al. 2010): candidate phrases are
    maximal runs of content words between stopword/non-alpha breakers;
    each word scores deg/freq over the document's phrase graph (deg =
    Σ length of phrases containing it), and a phrase scores the sum of
    its words — top-K phrases per document.

    Fully relational and regex-free: breakers are detected with
    ``translate`` (a token is alphabetic iff deleting a–z empties it) so
    no cross-engine regex-dialect surface exists; phrase ids come from a
    cumulative breaker count (gaps-and-islands); phrase text reassembles
    with an order-pinned aggregation. Scores are FIXED-POINT integers —
    per-word floor(deg·10⁶ / freq) summed per phrase — integer end to
    end (the quantile-grid lesson: never hash-gate quantized doubles).

    Scale shape: one posexplode, two doc-keyed hash aggs (word stats,
    phrase reassembly), one broadcast-sized stoplist array, one per-doc
    top-K window. Nothing global; every shuffle is doc-keyed."""
    stops = F.array(*[F.lit(w) for w in RAKE_STOPS])
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.lower(F.col("text")).alias("t")
    )
    toks = docs.select(
        "doc_id",
        F.posexplode(F.filter(F.split(F.col("t"), " "), lambda x: x != "")).alias(
            "pos", "term"
        ),
    )
    is_breaker = F.array_contains(stops, F.col("term")) | (
        F.translate(F.col("term"), "abcdefghijklmnopqrstuvwxyz", "") != ""
    )
    flagged = toks.select(
        "doc_id", "pos", "term", is_breaker.cast("int").alias("brk")
    )
    w_cum = (
        Window.partitionBy("doc_id")
        .orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    phrased = (
        flagged.withColumn("phrase_id", F.sum("brk").over(w_cum))
        .filter(F.col("brk") == 0)
        .select("doc_id", "phrase_id", "pos", "term")
    )
    plen = Window.partitionBy("doc_id", "phrase_id")
    sized = phrased.withColumn("phrase_len", F.count(F.lit(1)).over(plen)).filter(
        F.col("phrase_len") <= RAKE_MAX_PHRASE
    )
    word_stats = sized.groupBy("doc_id", "term").agg(
        F.count(F.lit(1)).alias("freq"),
        F.sum("phrase_len").alias("deg"),
    )
    scored_words = sized.join(word_stats, ["doc_id", "term"]).select(
        "doc_id",
        "phrase_id",
        "pos",
        "term",
        F.expr("(deg * 1000000) DIV freq").alias("wscore_fp"),  # integer div
    )
    phrases = scored_words.groupBy("doc_id", "phrase_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "term"))),
                lambda s: s["term"],
            ),
            " ",
        ).alias("phrase"),
        F.sum("wscore_fp").alias("score_fp"),
        F.count(F.lit(1)).alias("n_words"),
    )
    w_rank = Window.partitionBy("doc_id").orderBy(
        F.col("score_fp").desc(), F.col("phrase").asc(), F.col("phrase_id").asc()
    )
    return (
        phrases.withColumn("rk", F.row_number().over(w_rank))
        .filter(F.col("rk") <= RAKE_TOPK)
        .select(
            "doc_id",
            F.col("rk").cast("int").alias("rank"),
            "phrase",
            F.col("score_fp").cast("long").alias("score_fp"),
            F.col("n_words").cast("long").alias("n_words"),
        )
        .orderBy("doc_id", "rank")
    )


def _sql_rake() -> str:
    stops = ", ".join(f"'{w}'" for w in RAKE_STOPS)
    return f"""
WITH toks AS (
  SELECT doc_id, CAST(i - 1 AS BIGINT) AS pos, arr[CAST(i AS INTEGER)] AS term
  FROM (SELECT doc_id, list_filter(string_split(lower(text), ' '), x -> x <> '') AS arr
        FROM documents) d,
       UNNEST(range(1, CAST(len(d.arr) AS BIGINT) + 1)) AS t(i)
), flagged AS (
  SELECT doc_id, pos, term,
         CASE WHEN term IN ({stops})
                OR translate(term, 'abcdefghijklmnopqrstuvwxyz', '') <> ''
              THEN 1 ELSE 0 END AS brk
  FROM toks
), phrased AS (
  SELECT doc_id, pos, term,
         SUM(brk) OVER (PARTITION BY doc_id ORDER BY pos
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS phrase_id
  FROM flagged
  QUALIFY brk = 0
), sized AS (
  SELECT *, COUNT(*) OVER (PARTITION BY doc_id, phrase_id) AS phrase_len
  FROM phrased
  QUALIFY phrase_len <= {RAKE_MAX_PHRASE}
), word_stats AS (
  SELECT doc_id, term, COUNT(*) AS freq, SUM(phrase_len) AS deg
  FROM sized GROUP BY doc_id, term
), scored_words AS (
  SELECT s.doc_id, s.phrase_id, s.pos, s.term,
         CAST((w.deg * 1000000) // w.freq AS BIGINT) AS wscore_fp
  FROM sized s JOIN word_stats w USING (doc_id, term)
), phrases AS (
  SELECT doc_id, phrase_id,
         string_agg(term, ' ' ORDER BY pos) AS phrase,
         SUM(wscore_fp) AS score_fp,
         COUNT(*) AS n_words
  FROM scored_words GROUP BY doc_id, phrase_id
)
SELECT doc_id, CAST(rk AS INTEGER) AS rank, phrase,
       CAST(score_fp AS BIGINT) AS score_fp, CAST(n_words AS BIGINT) AS n_words
FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
                                   ORDER BY score_fp DESC, phrase ASC, phrase_id ASC) AS rk
      FROM phrases)
WHERE rk <= {RAKE_TOPK}
ORDER BY doc_id, rank
"""


# ---------------------------------------------------------------------------
# Character-bigram language-model quality score (perplexity-style filter)
# ---------------------------------------------------------------------------

BIGRAM_K = 0.5  # add-k smoothing constant (exact binary fraction)


def q_text_bigram_lm_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Character-bigram LM quality score per document — the CCNet-style
    "train an n-gram LM on the corpus, score each document by how typical
    its character transitions are" filter. p(y|x) is add-k smoothed over
    the corpus bigram/context counts; the document score is the
    ARITHMETIC mean of its bigram probabilities. (True perplexity is a
    geometric mean, i.e. exp/log — transcendentals this repo bans from
    hash-gated values (tests/test_numeric_portability.py); the arithmetic
    mean is a rational monotone-comparable typicality signal computed
    entirely with correctly-rounded IEEE ops.)

    Scale shape: bigram extraction is a length-proportional explode (the
    inherent cost of char n-gram modeling) feeding TWO map-side-combinable
    hash aggs (bigram counts, context counts) whose results are
    vocab²-bounded — broadcast back onto the doc-bigram stream, so the
    only data-sized shuffle is the per-doc score agg on doc_id."""
    # length-<2 docs have no bigrams: filter explicitly — Spark's
    # sequence(1, 0) would otherwise emit a DESCENDING [1, 0] sequence.
    docs = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id", F.lower(F.col("text")).alias("t"))
        .filter(F.length("t") >= 2)
    )
    # build the bigram ARRAY per doc, then explode: the naive
    # explode(sequence)-then-substring carries the FULL text through
    # every exploded row (measured ~10 s at sf0.1; this shape ~3 s —
    # exploded rows are two chars wide)
    grams = docs.select(
        "doc_id",
        F.explode(
            F.expr("transform(sequence(1, length(t) - 1), i -> substring(t, i, 2))")
        ).alias("bg"),
    ).localCheckpoint(eager=True)  # train + score both read it: one explode
    model = grams.groupBy(F.col("bg")).agg(F.count(F.lit(1)).alias("c_xy"))
    # context counts and vocab derive from the VOCAB²-bounded model table
    # (Σ c_xy grouped by first char ≡ counting grams by first char) — two
    # fewer full corpus explodes than aggregating grams directly
    ctx = model.groupBy(F.substring("bg", 1, 1).alias("x")).agg(
        F.sum("c_xy").alias("c_x")
    )
    vocab = model.select(
        F.countDistinct(F.substring("bg", 2, 1)).alias("v")
    )
    k = F.lit(BIGRAM_K)
    scored = (
        grams.join(F.broadcast(model), "bg")
        .withColumn("x", F.substring("bg", 1, 1))
        .join(F.broadcast(ctx), "x")
        .crossJoin(F.broadcast(vocab))
        .select(
            "doc_id",
            (
                (F.col("c_xy").cast("double") + k)
                / (F.col("c_x").cast("double") + k * F.col("v").cast("double"))
            ).alias("p"),
        )
    )
    return (
        scored.groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_bigrams"), dsum("p", scale=12).alias("sp"))
        .select(
            "doc_id",
            F.col("n_bigrams").cast("long").alias("n_bigrams"),
            (F.col("sp") / F.col("n_bigrams").cast("double")).alias("lm_score"),
        )
        .orderBy("doc_id")
    )


_ORACLE_BIGRAM_LM = f"""
WITH d AS (
  SELECT doc_id, lower(text) AS t FROM documents WHERE length(text) >= 2
), grams AS (
  SELECT doc_id, substr(t, CAST(i AS INTEGER), 2) AS bg
  FROM d, UNNEST(range(1, CAST(length(t) AS BIGINT))) AS u(i)
), model AS (
  SELECT bg, COUNT(*) AS c_xy FROM grams GROUP BY bg
), ctx AS (
  SELECT substr(bg, 1, 1) AS x, SUM(c_xy) AS c_x FROM model GROUP BY 1
), vocab AS (
  SELECT COUNT(DISTINCT substr(bg, 2, 1)) AS v FROM model
), scored AS (
  SELECT g.doc_id,
         (CAST(m.c_xy AS DOUBLE) + {BIGRAM_K})
           / (CAST(c.c_x AS DOUBLE) + {BIGRAM_K} * CAST(vocab.v AS DOUBLE)) AS p
  FROM grams g
  JOIN model m USING (bg)
  JOIN ctx c ON substr(g.bg, 1, 1) = c.x
  CROSS JOIN vocab
)
SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
       {sql_dsum("p", scale=12)} / CAST(COUNT(*) AS DOUBLE) AS lm_score
FROM scored
GROUP BY doc_id
ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# Simpson lexical diversity (corpus repeat-rate per language)
# ---------------------------------------------------------------------------


def q_text_simpson_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Simpson repeat-rate / lexical diversity per language: the
    probability that two tokens drawn WITHOUT replacement from the
    language's corpus are the same word, D = Σc_w(c_w−1) / (N(N−1)), and
    its complement 1−D (Simpson diversity) — the curation-side twin of
    ``text_repetition`` (which scores documents; this profiles the corpus
    a language model would train on, flagging low-diversity scrape
    sources). Uses the module's shared whitespace-token convention.

    Exactness: token counts are integers, the collision mass Σc(c−1) is
    an exact DECIMAL(38,0) sum (c ≤ 10¹² per word at 100 TB ⇒ c² ≤ 10²⁴
    per addend), and D is ONE division of two exact values — bit-stable
    everywhere, no entropy-style log sums (engine-ordered float addition)
    anywhere.

    Scale shape: explode → (lang, token) hash agg with map-side combine —
    the word-count topology, Spark's best-optimized shuffle — then a
    second tiny agg to |languages| rows. Nothing else touches raw text.
    """
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(
        "lang", F.explode(_tokens(F.col("text"))).alias("w")
    )
    per_w = tok.groupBy("lang", "w").agg(F.count(F.lit(1)).alias("c"))
    dec18 = lambda col: col.cast("decimal(18,0)")
    m = per_w.groupBy("lang").agg(
        F.sum("c").cast("long").alias("n_tokens"),
        F.count(F.lit(1)).cast("long").alias("vocab"),
        F.sum(dec18(F.col("c")) * dec18(F.col("c") - F.lit(1))).alias("coll"),
    )
    nd = F.col("n_tokens").cast("double")
    d = F.col("coll").cast("double") / (nd * (nd - F.lit(1.0)))
    return m.select(
        "lang",
        "n_tokens",
        "vocab",
        d.alias("simpson_repeat"),
        (F.lit(1.0) - d).alias("simpson_diversity"),
    ).orderBy("lang")


_ORACLE_SIMPSON = f"""
WITH tok AS (
  SELECT lang, unnest({_sql_tokens("text")}) AS w FROM documents
), per_w AS (
  SELECT lang, w, COUNT(*) AS c FROM tok GROUP BY 1, 2
), m AS (
  SELECT lang,
         CAST(SUM(c) AS BIGINT) AS n_tokens,
         CAST(COUNT(*) AS BIGINT) AS vocab,
         SUM(CAST(c AS DECIMAL(18,0)) * CAST(c - 1 AS DECIMAL(18,0))) AS coll
  FROM per_w GROUP BY 1
)
SELECT lang, n_tokens, vocab,
       CAST(coll AS DOUBLE)
         / (CAST(n_tokens AS DOUBLE) * (CAST(n_tokens AS DOUBLE) - 1.0))
         AS simpson_repeat,
       1.0 - CAST(coll AS DOUBLE)
         / (CAST(n_tokens AS DOUBLE) * (CAST(n_tokens AS DOUBLE) - 1.0))
         AS simpson_diversity
FROM m
ORDER BY lang
"""


# ---------------------------------------------------------------------------
# Flesch reading-ease scoring (readability curation signal)
# ---------------------------------------------------------------------------

# Flesch constants, folded once (identical literals in both engines)
FLESCH_A, FLESCH_B, FLESCH_C = 206.835, 1.015, 84.6
FLESCH_EASY, FLESCH_HARD = 60.0, 30.0


def q_text_readability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flesch reading-ease per language: score = A − B·(words/sentences)
    − C·(syllables/words) with the classic constants, syllables
    approximated as vowel-group runs (the standard in-database proxy) and
    sentences as terminal-punctuation runs (floored at 1) — the
    readability rung of the curation ladder next to ``text_quality``'s
    surface ratios and ``text_bigram_lm_score``'s LM typicality (training
    corpora are routinely filtered on exactly this signal).

    Determinism: word/sentence/syllable counts are exact integers from
    Java-regex∩RE2-safe patterns; each per-doc score is a fixed-shape
    IEEE expression; band counts are exact, and the per-language mean
    uses the module-standard decimal-quantized sum (``dsum`` at scale 6)
    so no engine-ordered float addition exists anywhere. Scale shape:
    ONE scan with per-row regex work, then a map-side-combinable hash
    agg to |languages| rows.
    """
    docs = load_table(spark, sf_dir, "documents")
    w = F.size(_tokens(F.col("text")))
    sent = F.greatest(
        F.lit(1), F.size(F.regexp_extract_all(F.col("text"), F.lit("[.!?]+"), 0))
    )
    syl = F.size(
        F.regexp_extract_all(F.lower(F.col("text")), F.lit("[aeiouy]+"), 0)
    )
    per_doc = (
        docs.select("lang", w.alias("w"), sent.alias("sent"), syl.alias("syl"))
        .filter(F.col("w") > 0)
        .select(
            "lang",
            (
                F.lit(FLESCH_A)
                - F.lit(FLESCH_B)
                * (F.col("w").cast("double") / F.col("sent").cast("double"))
                - F.lit(FLESCH_C)
                * (F.col("syl").cast("double") / F.col("w").cast("double"))
            ).alias("score"),
        )
    )
    return (
        per_doc.groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum((F.col("score") >= FLESCH_EASY).cast("long"))
            .cast("long")
            .alias("n_easy"),
            F.sum(
                (
                    (F.col("score") < FLESCH_EASY)
                    & (F.col("score") >= FLESCH_HARD)
                ).cast("long")
            )
            .cast("long")
            .alias("n_standard"),
            F.sum((F.col("score") < FLESCH_HARD).cast("long"))
            .cast("long")
            .alias("n_difficult"),
            (dsum("score", scale=6) / F.count(F.lit(1))).alias("mean_score"),
        )
        .orderBy("lang")
    )


_ORACLE_READABILITY = f"""
WITH per_doc AS (
  SELECT lang,
         {FLESCH_A!r} - {FLESCH_B!r} * (CAST(w AS DOUBLE) / CAST(sent AS DOUBLE))
           - {FLESCH_C!r} * (CAST(syl AS DOUBLE) / CAST(w AS DOUBLE)) AS score
  FROM (
    SELECT lang,
           len({_sql_tokens("text")}) AS w,
           GREATEST(1, len(regexp_extract_all(text, '[.!?]+'))) AS sent,
           len(regexp_extract_all(lower(text), '[aeiouy]+')) AS syl
    FROM documents
  )
  WHERE w > 0
)
SELECT lang,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(CASE WHEN score >= {FLESCH_EASY!r} THEN 1 ELSE 0 END) AS BIGINT)
         AS n_easy,
       CAST(SUM(CASE WHEN score < {FLESCH_EASY!r} AND score >= {FLESCH_HARD!r}
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_standard,
       CAST(SUM(CASE WHEN score < {FLESCH_HARD!r} THEN 1 ELSE 0 END) AS BIGINT)
         AS n_difficult,
       ({sql_dsum("score", scale=6)} / COUNT(*)) AS mean_score
FROM per_doc
GROUP BY 1
ORDER BY lang
"""


# ---------------------------------------------------------------------------
# Token-frequency Gini concentration (round 13 late)
# ---------------------------------------------------------------------------


def q_text_vocab_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini coefficient of the token-frequency distribution per source —
    how CONCENTRATED is vocabulary use: near 1 means a few tokens carry
    almost all the mass (templated/boilerplate text; a strong
    machine-generated signal), near the natural-language band means a
    Zipfian spread. The CONCENTRATION member of the lexical-diversity
    shelf — ``text_hapax_ratio`` counts the tail, ``text_yules_k`` /
    ``text_simpson_diversity`` measure collision mass, ``text_zipf_rankfreq``
    shows the curve; Gini summarizes the whole Lorenz curve of token
    use in one bounded number (the ``gini_revenue`` machinery re-aimed
    at language).

    Exactness: the closed form G = (2·Σi·cᵢ − (V+1)·Σc)/(V·Σc) over
    counts sorted ascending with rank i (ties broken by token text —
    Σi·cᵢ is invariant to tie order since tied blocks share c); Σi·c is
    a DECIMAL(19)×DECIMAL(19) product summed at DECIMAL(38,0); G is
    one IEEE expression per source. Degenerate contract: a
    single-token-type source (V ≤ 1) → G NULL under an explicit guard.

    Scale shape: one token explode → (source, token) hash agg →
    per-source rank window over the vocab-sized frame → |sources|-row
    closed form.

    Reference analog: none (engine addition, SURVEY.md §2.7)."""
    docs = load_table(spark, sf_dir, "documents").select("source", "text")
    tok = docs.select("source", F.explode(_tokens(F.col("text"))).alias("w"))
    per_w = tok.groupBy("source", "w").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    i = F.row_number().over(
        Window.partitionBy("source").orderBy("c", "w")
    )
    ranked = per_w.select(
        "source",
        "c",
        i.cast("decimal(19,0)").alias("i"),
    )
    agg = ranked.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("vocab"),
        F.sum("c").cast("long").alias("n_tokens"),
        F.sum(F.col("i") * F.col("c").cast("decimal(19,0)"))
        .cast("decimal(38,0)")
        .alias("sic"),
    )
    vd = F.col("vocab").cast("double")
    sd = F.col("n_tokens").cast("double")
    g = (
        F.lit(2.0) * F.col("sic").cast("double")
        - (vd + F.lit(1.0)) * sd
    ) / (vd * sd)
    ok = F.col("vocab") > 1
    return agg.select(
        "source",
        "vocab",
        "n_tokens",
        F.when(ok, g).alias("gini_token_freq"),
    ).orderBy("source")


_ORACLE_VOCAB_GINI = f"""
WITH tok AS (
  SELECT source, unnest({_sql_tokens("text")}) AS w FROM documents
), per_w AS (
  SELECT source, w, CAST(COUNT(*) AS BIGINT) AS c FROM tok GROUP BY 1, 2
), ranked AS (
  SELECT source, c,
         CAST(ROW_NUMBER() OVER (PARTITION BY source ORDER BY c, w) AS DECIMAL(19,0)) AS i
  FROM per_w
), agg AS (
  SELECT source,
         CAST(COUNT(*) AS BIGINT) AS vocab,
         CAST(SUM(c) AS BIGINT) AS n_tokens,
         CAST(SUM(i * CAST(c AS DECIMAL(19,0))) AS DECIMAL(38,0)) AS sic
  FROM ranked GROUP BY 1
)
SELECT source, vocab, n_tokens,
       CASE WHEN vocab > 1 THEN
         (2.0 * CAST(sic AS DOUBLE)
          - (CAST(vocab AS DOUBLE) + 1.0) * CAST(n_tokens AS DOUBLE))
         / (CAST(vocab AS DOUBLE) * CAST(n_tokens AS DOUBLE)) END AS gini_token_freq
FROM agg
ORDER BY source
"""


# ---------------------------------------------------------------------------
# Syllable-free readability panel: ARI + Coleman-Liau (round 13)
# ---------------------------------------------------------------------------

# Classic constants, folded once (identical literals in both engines)
ARI_A, ARI_B, ARI_C = 4.71, 0.5, 21.43
CLI_A, CLI_B, CLI_C = 0.0588, 0.296, 15.8
GRADE_HARD = 12.0  # above-high-school cut for the hard-share column


def q_text_readability_panel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Automated Readability Index + Coleman-Liau grade per SOURCE — the
    two classic SYLLABLE-FREE readability formulas (ARI: Senter & Smith
    1967, grade = 4.71·chars/words + 0.5·words/sentences − 21.43;
    Coleman-Liau 1975, grade = 0.0588·L − 0.296·S − 15.8 with L =
    letters per 100 words, S = sentences per 100 words). Both were
    designed for machine scoring on character counts alone, so unlike
    ``text_readability_flesch`` they carry NO syllable heuristic — the
    panel plus flesch gives curation three independent grade signals,
    and the per-source grouping (vs flesch's per-language) makes this
    the which-crawl-is-noise table.

    Determinism: character/word/sentence counts are exact integers from
    Java-regex∩RE2-safe patterns (ARI counts [A-Za-z0-9], CLI counts
    letters only, per each formula's definition; sentences floored at
    1); each per-doc grade is ONE fixed-shape IEEE expression on those
    exact ints; the per-source means use the FLOOR-quantized sum
    (``fsum`` scale 4 — dsum's half-up/half-even boundary split fired
    live on this entry's first gate run; scale 4 keeps |sum|·10^4
    inside the 2^53 exact window past 10^9 docs) and the hard-share is
    a ratio of exact counts. Empty-token docs are excluded by the w > 0
    filter (the module convention).

    Scale shape: ONE scan with per-row regex work, then a
    map-side-combinable hash agg to |sources| rows.

    Reference analog: none (engine addition, SURVEY.md §2.7)."""
    docs = load_table(spark, sf_dir, "documents")
    w = F.size(_tokens(F.col("text")))
    sent = F.greatest(
        F.lit(1), F.size(F.regexp_extract_all(F.col("text"), F.lit("[.!?]+"), 0))
    )
    alnum = F.length(F.regexp_replace(F.col("text"), "[^A-Za-z0-9]", ""))
    letters = F.length(F.regexp_replace(F.col("text"), "[^A-Za-z]", ""))
    wd = F.col("w").cast("double")
    ari = (
        F.lit(ARI_A) * (F.col("alnum").cast("double") / wd)
        + F.lit(ARI_B) * (wd / F.col("sent").cast("double"))
        - F.lit(ARI_C)
    )
    cli = (
        F.lit(CLI_A) * (F.lit(100.0) * F.col("letters").cast("double") / wd)
        - F.lit(CLI_B) * (F.lit(100.0) * F.col("sent").cast("double") / wd)
        - F.lit(CLI_C)
    )
    per_doc = (
        docs.select(
            "source",
            w.alias("w"),
            sent.alias("sent"),
            alnum.alias("alnum"),
            letters.alias("letters"),
        )
        .filter(F.col("w") > 0)
        .select("source", ari.alias("ari"), cli.alias("cli"))
    )
    return (
        per_doc.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            (fsum("ari", scale=4) / F.count(F.lit(1))).alias("mean_ari"),
            (fsum("cli", scale=4) / F.count(F.lit(1))).alias("mean_cli"),
            F.sum((F.col("ari") > GRADE_HARD).cast("long"))
            .cast("long")
            .alias("n_hard_ari"),
            (
                F.sum((F.col("ari") > GRADE_HARD).cast("long")).cast("double")
                / F.count(F.lit(1)).cast("double")
            ).alias("hard_share"),
        )
        .orderBy("source")
    )


_ORACLE_READABILITY_PANEL = f"""
WITH per_doc AS (
  SELECT source,
         {ARI_A!r} * (CAST(alnum AS DOUBLE) / CAST(w AS DOUBLE))
           + {ARI_B!r} * (CAST(w AS DOUBLE) / CAST(sent AS DOUBLE))
           - {ARI_C!r} AS ari,
         {CLI_A!r} * (100.0 * CAST(letters AS DOUBLE) / CAST(w AS DOUBLE))
           - {CLI_B!r} * (100.0 * CAST(sent AS DOUBLE) / CAST(w AS DOUBLE))
           - {CLI_C!r} AS cli
  FROM (
    SELECT source,
           len({_sql_tokens("text")}) AS w,
           GREATEST(1, len(regexp_extract_all(text, '[.!?]+'))) AS sent,
           length(regexp_replace(text, '[^A-Za-z0-9]', '', 'g')) AS alnum,
           length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS letters
    FROM documents
  )
  WHERE w > 0
)
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       ({sql_fsum("ari", scale=4)} / COUNT(*)) AS mean_ari,
       ({sql_fsum("cli", scale=4)} / COUNT(*)) AS mean_cli,
       CAST(SUM(CASE WHEN ari > {GRADE_HARD!r} THEN 1 ELSE 0 END) AS BIGINT)
         AS n_hard_ari,
       CAST(SUM(CASE WHEN ari > {GRADE_HARD!r} THEN 1 ELSE 0 END) AS DOUBLE)
         / CAST(COUNT(*) AS DOUBLE) AS hard_share
FROM per_doc
GROUP BY 1
ORDER BY source
"""


# ---------------------------------------------------------------------------
# Collocation mining by lift (round 8)
# ---------------------------------------------------------------------------

COLLOC_MIN_SUPPORT = 5   # bigram count floor — kills one-off noise pairs
COLLOC_TOP = 30


def q_text_collocations_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Adjacent-bigram collocation mining ranked by LIFT — the rational
    surrogate for PMI (PMI = log(lift), and log is banned by the
    portability policy; lift preserves the exact ranking, which is all a
    collocation list consumes). lift(a,b) = P(ab)/(P(a)·P(b)) computed as
    (c_ab/B) / ((c_a/U)·(c_b/U)) in ONE fixed IEEE op order from exact
    integer counts. The multiword-expression detector every tokenizer
    pipeline runs before vocabulary freezing.

    Scale shape: one positional explode per document (length-
    proportional), two map-side-combinable count aggs (bigrams,
    unigrams); the unigram table is vocabulary-bounded and broadcast
    onto the bigram counts twice; global totals are 1-row broadcasts.
    Support floor {sup} + top-{top} under a total order.
    """
    docs = load_table(spark, sf_dir, "documents").select(
        _tokens(F.col("text")).alias("toks")
    )
    toks = docs.filter(F.size("toks") >= 2)  # sequence(1,0) descends — guard
    bigrams = (
        toks.select(
            F.explode(
                F.transform(
                    F.sequence(F.lit(2), F.size("toks")),
                    lambda i: F.struct(
                        F.element_at("toks", i - 1).alias("w1"),
                        F.element_at("toks", i).alias("w2"),
                    ),
                )
            ).alias("bg")
        )
        .select("bg.w1", "bg.w2")
        .groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("c_ab"))
    )
    uni = (
        docs.select(F.explode("toks").alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("c_w"))
    )
    tot_bi = bigrams.agg(F.sum("c_ab").alias("total_bi"))
    tot_uni = uni.agg(F.sum("c_w").alias("total_uni"))
    ua = uni.select(F.col("w").alias("w1"), F.col("c_w").alias("c_a"))
    ub = uni.select(F.col("w").alias("w2"), F.col("c_w").alias("c_b"))
    ud = F.col("total_uni").cast("double")
    lift = (F.col("c_ab").cast("double") / F.col("total_bi").cast("double")) / (
        (F.col("c_a").cast("double") / ud) * (F.col("c_b").cast("double") / ud)
    )
    return (
        bigrams.filter(F.col("c_ab") >= COLLOC_MIN_SUPPORT)
        .join(F.broadcast(ua), "w1")
        .join(F.broadcast(ub), "w2")
        .crossJoin(F.broadcast(tot_bi))
        .crossJoin(F.broadcast(tot_uni))
        .select("w1", "w2", "c_ab", "c_a", "c_b", lift.alias("lift"))
        .orderBy(F.desc("lift"), F.asc("w1"), F.asc("w2"))
        .limit(COLLOC_TOP)
    )
q_text_collocations_lift.__doc__ = q_text_collocations_lift.__doc__ and q_text_collocations_lift.__doc__.format(sup=COLLOC_MIN_SUPPORT, top=COLLOC_TOP)


def _sql_collocations() -> str:
    t = _sql_tokens("text")
    return f"""
WITH toks AS (
  SELECT {t} AS toks FROM documents
), bigrams AS (
  SELECT toks[i.i - 1] AS w1, toks[i.i] AS w2
  FROM toks, unnest(generate_series(2, len(toks))) AS i(i)
  WHERE len(toks) >= 2
), bg AS (
  SELECT w1, w2, COUNT(*) AS c_ab FROM bigrams GROUP BY 1, 2
), uni AS (
  SELECT w, COUNT(*) AS c_w FROM (SELECT unnest(toks) AS w FROM toks) GROUP BY 1
), tot AS (
  SELECT (SELECT SUM(c_ab) FROM bg) AS total_bi,
         (SELECT SUM(c_w) FROM uni) AS total_uni
)
SELECT bg.w1, bg.w2, CAST(bg.c_ab AS BIGINT) AS c_ab,
       CAST(ua.c_w AS BIGINT) AS c_a, CAST(ub.c_w AS BIGINT) AS c_b,
       (CAST(bg.c_ab AS DOUBLE) / CAST(tot.total_bi AS DOUBLE))
         / ((CAST(ua.c_w AS DOUBLE) / CAST(tot.total_uni AS DOUBLE))
            * (CAST(ub.c_w AS DOUBLE) / CAST(tot.total_uni AS DOUBLE))) AS lift
FROM bg
JOIN uni ua ON ua.w = bg.w1
JOIN uni ub ON ub.w = bg.w2
CROSS JOIN tot
WHERE bg.c_ab >= {COLLOC_MIN_SUPPORT}
ORDER BY lift DESC, bg.w1 ASC, bg.w2 ASC
LIMIT {COLLOC_TOP}
"""


# ---------------------------------------------------------------------------
# Zipf rank-frequency audit (round 8)
# ---------------------------------------------------------------------------

ZIPF_TOP = 30


def q_text_zipf_rankfreq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf rank-frequency table of the corpus vocabulary: rank r by
    frequency (ties broken by word — total order), the rank·frequency
    product (near-constant for natural text, the classic Zipf check),
    and each word's corpus share. Synthetic or template-generated text
    shows a FLAT product curve (this corpus does — the uniform-vocabulary
    generator is visible in exactly this audit), scraped natural text a
    decaying one; the plot every corpus-health dashboard starts with.

    Scale shape: one token-explode count agg (map-side combinable) to a
    VOCABULARY-sized table; the rank window runs over that frame, not
    the data. Exact integers + two final divisions."""
    uni = (
        load_table(spark, sf_dir, "documents")
        .select(F.explode(_tokens(F.col("text"))).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    tot = uni.agg(F.sum("freq").alias("total"))
    rk = F.row_number().over(Window.orderBy(F.desc("freq"), F.asc("w")))
    return (
        uni.orderBy(F.desc("freq"), F.asc("w"))
        .limit(ZIPF_TOP)
        .crossJoin(F.broadcast(tot))
        .select(
            rk.alias("rank"),
            "w",
            "freq",
            (rk * F.col("freq")).cast("long").alias("rank_x_freq"),
            (F.col("freq").cast("double") / F.col("total").cast("double")).alias(
                "share"
            ),
        )
        .orderBy("rank")
    )


def _sql_zipf() -> str:
    t = _sql_tokens("text")
    return f"""
WITH uni AS (
  SELECT w, COUNT(*) AS freq
  FROM (SELECT unnest({t}) AS w FROM documents)
  GROUP BY 1
), tot AS (SELECT SUM(freq) AS total FROM uni)
SELECT CAST(ROW_NUMBER() OVER (ORDER BY freq DESC, w ASC) AS BIGINT) AS rank,
       w, CAST(freq AS BIGINT) AS freq,
       CAST(ROW_NUMBER() OVER (ORDER BY freq DESC, w ASC) * freq AS BIGINT)
         AS rank_x_freq,
       CAST(freq AS DOUBLE) / CAST(total AS DOUBLE) AS share
FROM uni CROSS JOIN tot
ORDER BY rank
LIMIT {ZIPF_TOP}
"""



# ---------------------------------------------------------------------------
# Benchmark decontamination screen (round 8)
# ---------------------------------------------------------------------------

CONTAM_N = 5              # n-gram size (words) — the Brown et al. GPT-3 scale
CONTAM_BENCH_SRC = "src0"  # the held-out "benchmark" source


def q_benchmark_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-SOURCE contamination report: which training SOURCES leak the
    held-out benchmark (source '{b}'), at what rate? The sibling of
    ``sampling.q_decontaminate`` one level up the governance ladder:
    that entry lists the per-document overlaps a filter would drop (its
    benchmark cut is an id-fraction, grams are 8 words); THIS entry
    answers the provenance question — per source: document count,
    contaminated count (≥ 1 shared {n}-gram, n={n} = stricter), share,
    and the worst per-doc overlap — the table that decides which
    SUPPLIER of data gets a quality conversation, and that includes the
    clean-doc denominator the per-doc list can't report.

    Exactness: grams are compared as STRINGS (space-joined windows) — no
    hashing, no false positives; counts are integers, one share division.
    Scale shape: both sides explode to position-windowed grams (length-
    proportional, the substring-dedup shape); the benchmark gram set
    dedupes to its domain and the overlap is an equi-JOIN on the gram —
    at 100 TB the benchmark side is tiny (benchmarks are), so AQE
    broadcasts it and the train side never shuffles; the per-doc rollup
    is one map-side-combinable agg. A production variant hashes grams to
    8 bytes first — same plan, smaller shuffle width.
    """
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", _tokens(F.col("text")).alias("toks")
    )
    grams = (
        docs.filter(F.size("toks") >= CONTAM_N)
        .select(
            "doc_id",
            "source",
            F.explode(
                F.transform(
                    F.sequence(F.lit(0), F.size("toks") - CONTAM_N),
                    lambda i: F.array_join(F.slice("toks", i + 1, CONTAM_N), " "),
                )
            ).alias("gram"),
        )
    )
    bench = (
        grams.filter(F.col("source") == CONTAM_BENCH_SRC)
        .select("gram")
        .distinct()
    )
    train = grams.filter(F.col("source") != CONTAM_BENCH_SRC)
    overlaps = (
        train.join(bench, "gram")
        .groupBy("doc_id", "source")
        .agg(F.count(F.lit(1)).alias("n_shared_grams"))
    )
    train_docs = docs.filter(F.col("source") != CONTAM_BENCH_SRC).select(
        "doc_id", "source"
    )
    per_doc = train_docs.join(overlaps, ["doc_id", "source"], "left").select(
        "source", F.coalesce(F.col("n_shared_grams"), F.lit(0)).alias("n_shared")
    )
    return (
        per_doc.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.when(F.col("n_shared") > 0, 1).otherwise(0))
            .cast("long")
            .alias("n_contaminated"),
            F.max("n_shared").cast("long").alias("max_shared_grams"),
        )
        .select(
            "source",
            "n_docs",
            "n_contaminated",
            (F.col("n_contaminated").cast("double") / F.col("n_docs").cast("double")).alias(
                "contaminated_share"
            ),
            "max_shared_grams",
        )
        .orderBy("source")
    )
q_benchmark_contamination.__doc__ = q_benchmark_contamination.__doc__ and q_benchmark_contamination.__doc__.format(n=CONTAM_N, b=CONTAM_BENCH_SRC)


def _sql_contamination() -> str:
    t = _sql_tokens("text")
    return f"""
WITH toks AS (
  SELECT doc_id, source, {t} AS toks FROM documents
), grams AS (
  SELECT doc_id, source,
         array_to_string(toks[i.i + 1 : i.i + {CONTAM_N}], ' ') AS gram
  FROM toks, unnest(generate_series(0, len(toks) - {CONTAM_N})) AS i(i)
  WHERE len(toks) >= {CONTAM_N}
), bench AS (
  SELECT DISTINCT gram FROM grams WHERE source = '{CONTAM_BENCH_SRC}'
), ovl AS (
  SELECT g.doc_id, g.source, COUNT(*) AS n_shared_grams
  FROM grams g JOIN bench b USING (gram)
  WHERE g.source <> '{CONTAM_BENCH_SRC}'
  GROUP BY 1, 2
), per_doc AS (
  SELECT d.source, COALESCE(o.n_shared_grams, 0) AS n_shared
  FROM toks d LEFT JOIN ovl o ON d.doc_id = o.doc_id
  WHERE d.source <> '{CONTAM_BENCH_SRC}'
)
SELECT source,
       COUNT(*) AS n_docs,
       CAST(SUM(CASE WHEN n_shared > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_contaminated,
       CAST(SUM(CASE WHEN n_shared > 0 THEN 1 ELSE 0 END) AS DOUBLE)
         / CAST(COUNT(*) AS DOUBLE) AS contaminated_share,
       CAST(MAX(n_shared) AS BIGINT) AS max_shared_grams
FROM per_doc
GROUP BY 1
ORDER BY source
"""


# ---------------------------------------------------------------------------
# Hapax legomena profile (vocabulary-growth health of a corpus slice)
# ---------------------------------------------------------------------------


def q_text_hapax_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language hapax-legomena profile: vocabulary size, number of
    words occurring exactly once, and the hapax share of vocabulary and of
    tokens — the classic corpus-health diagnostic next to ``text_zipf_
    rankfreq`` (a collapsing hapax share flags template/boilerplate
    contamination; an exploding one flags OCR noise — both are the first
    things a pretraining-data audit checks). Counts are exact integers;
    the two ratios are single divisions.

    Scale shape: explode once, one (lang, token) hash agg (map-side
    combinable), then a per-lang agg over vocabulary-sized rows."""
    docs = load_table(spark, sf_dir, "documents").select("lang", "text")
    tok = docs.select("lang", F.explode(_tokens(F.col("text"))).alias("t"))
    counts = tok.groupBy("lang", "t").agg(F.count(F.lit(1)).alias("cnt"))
    out = counts.groupBy("lang").agg(
        F.count(F.lit(1)).cast("long").alias("vocab"),
        F.sum("cnt").cast("long").alias("n_tokens"),
        F.sum(F.when(F.col("cnt") == 1, 1).otherwise(0)).cast("long").alias("hapax"),
    )
    return out.select(
        "lang",
        "vocab",
        "n_tokens",
        "hapax",
        (F.col("hapax").cast("double") / F.col("vocab").cast("double")).alias(
            "hapax_vocab_share"
        ),
        (F.col("hapax").cast("double") / F.col("n_tokens").cast("double")).alias(
            "hapax_token_share"
        ),
    ).orderBy("lang")


_ORACLE_HAPAX = f"""
WITH tok AS (
  SELECT lang, UNNEST({_sql_tokens("text")}) AS t FROM documents
), counts AS (
  SELECT lang, t, COUNT(*) AS cnt FROM tok GROUP BY 1, 2
), outt AS (
  SELECT lang,
         CAST(COUNT(*) AS BIGINT) AS vocab,
         CAST(SUM(cnt) AS BIGINT) AS n_tokens,
         CAST(SUM(CASE WHEN cnt = 1 THEN 1 ELSE 0 END) AS BIGINT) AS hapax
  FROM counts GROUP BY 1
)
SELECT lang, vocab, n_tokens, hapax,
       CAST(hapax AS DOUBLE) / CAST(vocab AS DOUBLE) AS hapax_vocab_share,
       CAST(hapax AS DOUBLE) / CAST(n_tokens AS DOUBLE) AS hapax_token_share
FROM outt
ORDER BY lang
"""


# ---------------------------------------------------------------------------
# Burrows' Delta stylometric distance between sources
# ---------------------------------------------------------------------------

BURROWS_TOP_WORDS = 20
BURROWS_TOP_PAIRS = 25


def q_text_burrows_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Burrows' Delta between document sources: over the {k} most frequent
    corpus words, z-score each source's relative word frequency against
    the across-source mean/std, then Delta(a,b) = mean_w |z_a − z_b| — the
    standard stylometric fingerprint distance, used in curation to spot
    sources that are near-clones of each other (template farms) before
    they flood a training mix. Top {p} closest pairs ship.

    Exactness: relative frequencies are ratios of exact integers; the
    across-source moments and the |z| reductions are floor-quantized
    sums (both loops are source- and word-bounded: |sources|·{k} cells);
    sqrt is IEEE-exact. Scale shape: one explode + (source, word) hash
    agg is the only data-sized stage; the zero-filled source×word spine,
    moments, and the pair join all run on the tiny grid."""
    from us_flight_bigdata_dashboard_spark.functions.exact import fsum

    docs = load_table(spark, sf_dir, "documents").select("source", "text")
    tok = docs.select("source", F.explode(_tokens(F.col("text"))).alias("t"))
    counts = tok.groupBy("source", "t").agg(F.count(F.lit(1)).alias("cnt"))
    top_words = (
        counts.groupBy("t")
        .agg(F.sum("cnt").alias("tot"))
        .orderBy(F.desc("tot"), F.asc("t"))
        .limit(BURROWS_TOP_WORDS)
        .select("t")
    )
    totals = counts.groupBy("source").agg(F.sum("cnt").cast("long").alias("n_tok"))
    spine = totals.select("source", "n_tok").crossJoin(F.broadcast(top_words))
    dense = spine.join(counts, ["source", "t"], "left").select(
        "source",
        "t",
        (
            F.coalesce(F.col("cnt"), F.lit(0)).cast("double")
            / F.col("n_tok").cast("double")
        ).alias("f"),
    )
    mom = dense.groupBy("t").agg(
        F.count(F.lit(1)).cast("long").alias("ns"),
        fsum("f", scale=15).alias("sf"),
        fsum(F.col("f") * F.col("f"), scale=15).alias("sf2"),
    )
    nd = F.col("ns").cast("double")
    mu = F.col("sf") / nd
    sigma = F.sqrt(F.col("sf2") / nd - mu * mu)
    z = dense.join(F.broadcast(mom), "t").select(
        "source", "t", ((F.col("f") - mu) / sigma).alias("z")
    )
    a = z.select(F.col("source").alias("src_a"), "t", F.col("z").alias("z_a"))
    b = z.select(F.col("source").alias("src_b"), "t", F.col("z").alias("z_b"))
    pairs = a.join(b, "t").filter(F.col("src_a") < F.col("src_b"))
    delta = pairs.groupBy("src_a", "src_b").agg(
        (
            fsum(F.abs(F.col("z_a") - F.col("z_b")), scale=12)
            / F.lit(float(BURROWS_TOP_WORDS))
        ).alias("delta")
    )
    return delta.orderBy(F.asc("delta"), F.asc("src_a"), F.asc("src_b")).limit(
        BURROWS_TOP_PAIRS
    )
q_text_burrows_delta.__doc__ = q_text_burrows_delta.__doc__ and q_text_burrows_delta.__doc__.format(
        k=BURROWS_TOP_WORDS, p=BURROWS_TOP_PAIRS
    )


def _sql_burrows() -> str:
    from us_flight_bigdata_dashboard_spark.functions.exact import sql_fsum

    return f"""
WITH tok AS (
  SELECT source, UNNEST({_sql_tokens("text")}) AS t FROM documents
), counts AS (
  SELECT source, t, COUNT(*) AS cnt FROM tok GROUP BY 1, 2
), top_words AS (
  SELECT t FROM (SELECT t, SUM(cnt) AS tot FROM counts GROUP BY 1)
  ORDER BY tot DESC, t ASC LIMIT {BURROWS_TOP_WORDS}
), totals AS (
  SELECT source, CAST(SUM(cnt) AS BIGINT) AS n_tok FROM counts GROUP BY 1
), dense AS (
  SELECT totals.source, top_words.t,
         CAST(COALESCE(counts.cnt, 0) AS DOUBLE) / CAST(totals.n_tok AS DOUBLE) AS f
  FROM totals CROSS JOIN top_words
  LEFT JOIN counts ON counts.source = totals.source AND counts.t = top_words.t
), mom AS (
  SELECT t, CAST(COUNT(*) AS BIGINT) AS ns,
         {sql_fsum("f", 15)} AS sf,
         {sql_fsum("f * f", 15)} AS sf2
  FROM dense GROUP BY 1
), z AS (
  SELECT source, dense.t,
         (f - sf / CAST(ns AS DOUBLE))
           / sqrt(sf2 / CAST(ns AS DOUBLE)
                  - (sf / CAST(ns AS DOUBLE)) * (sf / CAST(ns AS DOUBLE))) AS z
  FROM dense JOIN mom ON dense.t = mom.t
), pairs AS (
  SELECT a.source AS src_a, b.source AS src_b,
         {sql_fsum("abs(a.z - b.z)", 12)} / {float(BURROWS_TOP_WORDS)!r} AS delta
  FROM z a JOIN z b ON a.t = b.t AND a.source < b.source
  GROUP BY 1, 2
)
SELECT src_a, src_b, delta FROM pairs
ORDER BY delta ASC, src_a ASC, src_b ASC
LIMIT {BURROWS_TOP_PAIRS}
"""


# ---------------------------------------------------------------------------
# TextRank keyword extraction (PageRank on the word co-occurrence graph)
# ---------------------------------------------------------------------------

TEXTRANK_DAMPING = 0.85
TEXTRANK_ITERS = 3
TEXTRANK_TOP = 10
TEXTRANK_FP = 10**15


def q_text_textrank_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TextRank keywords: weighted PageRank over the word co-occurrence
    graph (adjacent-token pairs within a document, both directions,
    edge weight = corpus co-occurrence count), {it} unrolled iterations
    at damping {d} — the graph-centrality counterpart of ``text_rake_
    keywords``/``collocations`` that rewards words sitting in many
    well-connected contexts rather than just frequent ones. Top {k}
    keywords ship.

    Scale shape: the one data-sized stage is tokenize + adjacent-pair
    explode into a (w1, w2) hash agg; the graph is VOCABULARY-sized (the
    corpus vocabulary, ~30 here) so every PageRank round is a join+agg
    over vocab-bounded frames. Contribution sums are fixed-point
    floor-quantized DECIMAL aggregates (the graph_pagerank pattern) and
    weighted degree is an exact integer — bit-stable on both engines.
    """
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    toks = docs.select("doc_id", _tokens(F.col("text")).alias("ts"))
    bi = toks.select(
        F.explode(
            F.expr(
                # greatest(..., 0): a document whose text tokenizes to an
                # EMPTY array would make the slice length -1 — a runtime
                # error in Spark while DuckDB just yields no rows for the
                # doc. Clamp so degenerate docs skip identically (ADVICE r9).
                "transform(slice(ts, 1, greatest(size(ts) - 1, 0)),"
                " (x, i) -> struct(x AS w1, element_at(ts, i + 2) AS w2))"
            )
        ).alias("p")
    ).select("p.w1", "p.w2")
    pairs = bi.filter(F.col("w1") != F.col("w2"))
    edges = (
        pairs.select("w1", "w2")
        .unionAll(pairs.select(F.col("w2").alias("w1"), F.col("w1").alias("w2")))
        .groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).cast("long").alias("wt"))
        .localCheckpoint(eager=True)
    )
    wdeg = edges.groupBy("w1").agg(F.sum("wt").cast("long").alias("wdeg"))
    n_row = wdeg.agg(F.count(F.lit(1)).alias("_n"))
    fp = F.lit(float(TEXTRANK_FP))
    ranks = wdeg.crossJoin(F.broadcast(n_row)).select(
        F.col("w1").alias("word"),
        "wdeg",
        "_n",
        (F.lit(1.0) / F.col("_n")).alias("rank"),
    )
    for _ in range(TEXTRANK_ITERS):
        contrib = ranks.join(edges, ranks["word"] == edges["w1"]).select(
            F.col("w2"),
            F.floor(
                (F.col("rank") * F.col("wt").cast("double") / F.col("wdeg").cast("double")) * fp
            )
            .cast("decimal(38,0)")
            .alias("c_fp"),
        )
        summed = contrib.groupBy("w2").agg(
            (F.sum("c_fp").cast("double") / fp).alias("_sum")
        )
        ranks = (
            wdeg.join(summed, wdeg["w1"] == summed["w2"])
            .crossJoin(F.broadcast(n_row))
            .select(
                F.col("w1").alias("word"),
                "wdeg",
                "_n",
                (
                    F.lit(1.0 - TEXTRANK_DAMPING) / F.col("_n")
                    + F.lit(TEXTRANK_DAMPING) * F.col("_sum")
                ).alias("rank"),
            )
        )
    return (
        ranks.select("word", F.col("wdeg").alias("weighted_degree"), "rank")
        .orderBy(F.desc("rank"), F.asc("word"))
        .limit(TEXTRANK_TOP)
    )
q_text_textrank_keywords.__doc__ = q_text_textrank_keywords.__doc__ and q_text_textrank_keywords.__doc__.format(it=TEXTRANK_ITERS, d=TEXTRANK_DAMPING, k=TEXTRANK_TOP)


def _sql_textrank() -> str:
    fp = float(TEXTRANK_FP)
    base = f"""
toks AS (
  SELECT {_sql_tokens("text")} AS ts FROM documents
),
bi AS (
  SELECT UNNEST(list_transform(ts[1:len(ts)-1],
                (x, i) -> {{'w1': x, 'w2': ts[i + 1]}})) AS p
  FROM toks
),
pairs AS (
  SELECT p.w1 AS w1, p.w2 AS w2 FROM bi WHERE p.w1 <> p.w2
),
edges AS (
  SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS wt FROM (
    SELECT w1, w2 FROM pairs
    UNION ALL
    SELECT w2 AS w1, w1 AS w2 FROM pairs
  ) GROUP BY 1, 2
),
wdeg AS (SELECT w1, CAST(SUM(wt) AS BIGINT) AS wdeg FROM edges GROUP BY 1),
nn AS (SELECT COUNT(*) AS _n FROM wdeg),
r0 AS (SELECT w1 AS word, wdeg, _n, 1.0::DOUBLE / _n AS rank FROM wdeg, nn)"""
    iters = []
    prev = "r0"
    for i in range(1, TEXTRANK_ITERS + 1):
        iters.append(f"""
s{i} AS (
  SELECT e.w2,
         CAST(SUM(CAST(floor((r.rank * CAST(e.wt AS DOUBLE) / CAST(r.wdeg AS DOUBLE)) * {fp!r})
                       AS DECIMAL(38,0))) AS DOUBLE) / {fp!r} AS _sum
  FROM {prev} r JOIN edges e ON r.word = e.w1
  GROUP BY e.w2
),
r{i} AS (
  SELECT d.w1 AS word, d.wdeg, nn._n,
         {1.0 - TEXTRANK_DAMPING} / nn._n + {TEXTRANK_DAMPING} * s{i}._sum AS rank
  FROM wdeg d JOIN s{i} ON d.w1 = s{i}.w2, nn
)""")
        prev = f"r{i}"
    return (
        "WITH "
        + base
        + ","
        + ",".join(iters)
        + f"""
SELECT word, wdeg AS weighted_degree, rank FROM {prev}
ORDER BY rank DESC, word ASC
LIMIT {TEXTRANK_TOP}
"""
    )


# ---------------------------------------------------------------------------
# Pretraining-mix curation metrics: temperature-sampled source weights,
# per-source language purity, tokenizer fertility
# ---------------------------------------------------------------------------

MIX_TOKEN_BUDGET = 1_000_000  # sampled-tokens budget the mixture allocates


def q_source_mix_temperature(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-sampled pretraining mixture at alpha = 1/2: per source,
    raw token count n_i, sampling weight w_i = sqrt(n_i)/sum_j sqrt(n_j),
    the token allocation w_i * budget, and the EFFECTIVE EPOCHS
    (allocation / n_i) that allocation implies — the standard rebalancing
    that up-samples small sources without letting any one dominate
    (multilingual/multi-corpus training mixes). alpha = 1/2 is the one
    temperature expressible without pow(): sqrt is IEEE-correctly-rounded
    on both engines, so the weights are one fixed op sequence on exact
    integer token counts; epochs > 1 flags sources the budget would
    repeat.

    Scale shape: one tokenize+count hash agg to |sources| rows; the
    normalization constant is a broadcast 1-row scalar."""
    docs = load_table(spark, sf_dir, "documents").select("source", "text")
    counts = docs.groupBy("source").agg(
        F.sum(F.size(_tokens(F.col("text")))).cast("long").alias("n_tokens")
    )
    sq = F.sqrt(F.col("n_tokens").cast("double"))
    with_sq = counts.select("source", "n_tokens", sq.alias("sq"))
    total = with_sq.agg(fsum("sq", scale=9).alias("z"))
    out = with_sq.crossJoin(F.broadcast(total)).select(
        "source",
        "n_tokens",
        (F.col("sq") / F.col("z")).alias("mix_weight"),
        (F.col("sq") / F.col("z") * F.lit(float(MIX_TOKEN_BUDGET))).alias(
            "token_allocation"
        ),
        (
            F.col("sq")
            / F.col("z")
            * F.lit(float(MIX_TOKEN_BUDGET))
            / F.col("n_tokens").cast("double")
        ).alias("effective_epochs"),
    )
    return out.orderBy(F.desc("n_tokens"), F.asc("source"))


def _sql_mix_temperature() -> str:
    from us_flight_bigdata_dashboard_spark.functions.exact import sql_fsum

    return f"""
WITH counts AS (
  SELECT source,
         CAST(SUM(len({_sql_tokens("text")})) AS BIGINT) AS n_tokens
  FROM documents GROUP BY 1
), with_sq AS (
  SELECT source, n_tokens, sqrt(CAST(n_tokens AS DOUBLE)) AS sq FROM counts
), total AS (
  SELECT {sql_fsum("sq", 9)} AS z FROM with_sq
)
SELECT source, n_tokens,
       sq / z AS mix_weight,
       sq / z * {float(MIX_TOKEN_BUDGET)!r} AS token_allocation,
       sq / z * {float(MIX_TOKEN_BUDGET)!r} / CAST(n_tokens AS DOUBLE) AS effective_epochs
FROM with_sq CROSS JOIN total
ORDER BY n_tokens DESC, source ASC
"""


def q_source_lang_purity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language purity per document source: the majority language, its
    share, and the Gini-Simpson diversity 1 - sum_l p_l^2 of the source's
    language mix — the curation screen that flags crawl buckets mixing
    languages before they poison a monolingual training slice. Entropy
    needs log (banned); Gini-Simpson is the exact-rational diversity
    index: every p_l is a ratio of integers and the statistic is one
    fixed IEEE sequence. Scale shape: one (source, lang) hash agg, then
    arithmetic on the |sources|x|langs| frame (window top-1 for the
    majority label, deterministic tie-break)."""
    docs = load_table(spark, sf_dir, "documents").select("source", "lang")
    sl = docs.groupBy("source", "lang").agg(F.count(F.lit(1)).cast("long").alias("c"))
    w_all = Window.partitionBy("source")
    w_top = Window.partitionBy("source").orderBy(F.desc("c"), F.asc("lang"))
    scored = sl.select(
        "source",
        "lang",
        "c",
        F.sum("c").over(w_all).cast("long").alias("n"),
        F.sum(F.col("c") * F.col("c")).over(w_all).cast("long").alias("c2"),
        F.row_number().over(w_top).alias("rk"),
    ).filter(F.col("rk") == 1)
    nd = F.col("n").cast("double")
    return scored.select(
        "source",
        F.col("n").alias("n_docs"),
        F.col("lang").alias("majority_lang"),
        (F.col("c").cast("double") / nd).alias("majority_share"),
        (F.lit(1.0) - F.col("c2").cast("double") / (nd * nd)).alias(
            "gini_simpson"
        ),
    ).orderBy("source")


_ORACLE_LANG_PURITY = """
WITH sl AS (
  SELECT source, lang, CAST(COUNT(*) AS BIGINT) AS c
  FROM documents GROUP BY 1, 2
), scored AS (
  SELECT source, lang, c,
         CAST(SUM(c) OVER (PARTITION BY source) AS BIGINT) AS n,
         CAST(SUM(c * c) OVER (PARTITION BY source) AS BIGINT) AS c2,
         ROW_NUMBER() OVER (PARTITION BY source ORDER BY c DESC, lang ASC) AS rk
  FROM sl
)
SELECT source, n AS n_docs, lang AS majority_lang,
       CAST(c AS DOUBLE) / CAST(n AS DOUBLE) AS majority_share,
       1.0 - CAST(c2 AS DOUBLE) / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)) AS gini_simpson
FROM scored WHERE rk = 1
ORDER BY source
"""


def q_tokenizer_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer fertility per language: BPE-style pre-tokens (the
    ``BPE_PATTERN`` letter/digit/symbol runs) per whitespace word —
    the standard tokenizer-efficiency metric (fertility near 1 = the
    tokenizer's unit matches the language's orthography; high fertility
    = more compute per word). Both counts are exact integers from the
    same regex/split the BPE and quality entries use; the ratio is one
    division. Scale shape: one map-side-combinable hash agg over the
    scan — nothing domain-sized at all."""
    docs = load_table(spark, sf_dir, "documents").select("lang", "text")
    agg = docs.groupBy("lang").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum(F.size(_tokens(F.col("text")))).cast("long").alias("n_words"),
        F.sum(F.size(F.regexp_extract_all(F.col("text"), F.lit(BPE_PATTERN), 0)))
        .cast("long")
        .alias("n_bpe_tokens"),
    )
    return agg.select(
        "lang",
        "n_docs",
        "n_words",
        "n_bpe_tokens",
        (F.col("n_bpe_tokens").cast("double") / F.col("n_words").cast("double")).alias(
            "fertility"
        ),
    ).orderBy("lang")


_ORACLE_FERTILITY = f"""
SELECT lang,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(len({_sql_tokens("text")})) AS BIGINT) AS n_words,
       CAST(SUM(len(regexp_extract_all(text, '{BPE_PATTERN}'))) AS BIGINT) AS n_bpe_tokens,
       CAST(SUM(len(regexp_extract_all(text, '{BPE_PATTERN}'))) AS DOUBLE)
         / CAST(SUM(len({_sql_tokens("text")})) AS DOUBLE) AS fertility
FROM documents
GROUP BY lang
ORDER BY lang
"""


# ---------------------------------------------------------------------------
# Round-10 additions: DSIR-style importance weighting and segmented TTR
# ---------------------------------------------------------------------------

DSIR_TARGET_LANG = "en"
DSIR_K = 0.5  # add-k smoothing for both unigram models
DSIR_TOP = 25


def q_text_dsir_proxy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR-style importance weight per document: score each doc by how
    much its unigram distribution looks like the TARGET domain (lang =
    '{tl}') relative to the whole corpus — the data-selection-via-
    importance-resampling recipe (Xie et al.) that upsamples raw-crawl
    documents resembling a curated target before pretraining. The
    canonical weight is Σ log(p_t(w)/p_s(w)); log is a transcendental
    this matrix bans from hash-gated values, so the score is the
    ARITHMETIC mean of the per-token probability RATIOS (the
    ``text_bigram_lm_score`` escape) — a rational monotone-comparable
    domain-affinity signal: ratio > 1 ⇔ the token is target-typical.
    Both unigram models are add-{k} smoothed over the corpus vocabulary.

    Scale shape: ONE tokenize+explode of the corpus (localCheckpointed —
    model training and scoring both read it), TWO vocab-bounded hash
    aggs broadcast back onto the token stream, one per-doc agg. The only
    data-sized shuffle is the doc_id score agg. Top {top} docs ship
    under a total order."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang", "text")
    toks = docs.select(
        "doc_id",
        (F.col("lang") == DSIR_TARGET_LANG).cast("int").alias("is_t"),
        F.explode(_tokens(F.col("text"))).alias("w"),
    ).localCheckpoint(eager=True)
    model = toks.groupBy("w").agg(
        F.count(F.lit(1)).cast("long").alias("c_s"),
        F.sum("is_t").cast("long").alias("c_t"),
    )
    totals = model.agg(
        F.sum("c_s").cast("long").alias("n_s"),
        F.sum("c_t").cast("long").alias("n_t"),
        F.count(F.lit(1)).cast("long").alias("v"),
    )
    k = F.lit(DSIR_K)
    ratio = (
        (F.col("c_t").cast("double") + k)
        / (F.col("n_t").cast("double") + k * F.col("v").cast("double"))
    ) / (
        (F.col("c_s").cast("double") + k)
        / (F.col("n_s").cast("double") + k * F.col("v").cast("double"))
    )
    scored = (
        toks.join(F.broadcast(model), "w")
        .crossJoin(F.broadcast(totals))
        .select("doc_id", ratio.alias("r"))
    )
    return (
        scored.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_tokens"),
            fsum("r", scale=12).alias("sr"),
        )
        .select(
            "doc_id",
            "n_tokens",
            (F.col("sr") / F.col("n_tokens").cast("double")).alias("dsir_score"),
        )
        .orderBy(F.desc("dsir_score"), F.asc("doc_id"))
        .limit(DSIR_TOP)
    )
q_text_dsir_proxy.__doc__ = q_text_dsir_proxy.__doc__ and q_text_dsir_proxy.__doc__.format(tl=DSIR_TARGET_LANG, k=DSIR_K, top=DSIR_TOP)


_ORACLE_DSIR = f"""
WITH toks AS (
  SELECT doc_id,
         CASE WHEN lang = '{DSIR_TARGET_LANG}' THEN 1 ELSE 0 END AS is_t,
         w
  FROM documents,
       UNNEST(list_filter(string_split(lower(text), ' '), t -> t <> '')) AS u(w)
), model AS (
  SELECT w, CAST(COUNT(*) AS BIGINT) AS c_s, CAST(SUM(is_t) AS BIGINT) AS c_t
  FROM toks GROUP BY w
), totals AS (
  SELECT CAST(SUM(c_s) AS BIGINT) AS n_s, CAST(SUM(c_t) AS BIGINT) AS n_t,
         CAST(COUNT(*) AS BIGINT) AS v
  FROM model
), scored AS (
  SELECT doc_id,
         ((CAST(c_t AS DOUBLE) + {DSIR_K!r})
          / (CAST(n_t AS DOUBLE) + {DSIR_K!r} * CAST(v AS DOUBLE)))
         / ((CAST(c_s AS DOUBLE) + {DSIR_K!r})
            / (CAST(n_s AS DOUBLE) + {DSIR_K!r} * CAST(v AS DOUBLE))) AS r
  FROM toks JOIN model USING (w) CROSS JOIN totals
)
SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
       {sql_fsum("r", scale=12)} / CAST(COUNT(*) AS DOUBLE) AS dsir_score
FROM scored
GROUP BY doc_id
ORDER BY dsir_score DESC, doc_id ASC
LIMIT {DSIR_TOP}
"""


STTR_CHUNK = 20  # tokens per STTR segment


def q_text_sttr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Segmented type-token ratio (STTR) per document: split the token
    stream into fixed {c}-token segments, TTR = distinct/size per
    segment, report the mean — the length-robust lexical-diversity
    measure (plain TTR decays mechanically with document length, so
    corpus-quality dashboards segment first; ``text_hapax_ratio`` reads
    vocabulary novelty, STTR reads local diversity). Per-segment TTR is
    an exact integer ratio; the per-doc mean is a floor-quantized
    deterministic sum over the doc's segments.

    Scale shape: one posexplode (segment id = pos div {c}), one
    (doc, segment, token) dedup agg, one (doc, segment) count agg, one
    per-doc agg — every stage keyed by doc_id, map-side combinable, no
    windows at all."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    pos = docs.select(
        "doc_id", F.posexplode(_tokens(F.col("text"))).alias("pos", "w")
    ).select(
        "doc_id", (F.col("pos") / F.lit(STTR_CHUNK)).cast("int").alias("seg"), "w"
    )
    seg_stats = (
        pos.groupBy("doc_id", "seg")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_tok"),
            F.countDistinct("w").cast("long").alias("n_typ"),
        )
    )
    ttr = F.col("n_typ").cast("double") / F.col("n_tok").cast("double")
    return (
        seg_stats.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_segments"),
            F.sum("n_tok").cast("long").alias("n_tokens"),
            fsum(ttr, scale=12).alias("st"),
        )
        .select(
            "doc_id",
            "n_segments",
            "n_tokens",
            (F.col("st") / F.col("n_segments").cast("double")).alias("sttr"),
        )
        .orderBy("doc_id")
    )
q_text_sttr.__doc__ = q_text_sttr.__doc__ and q_text_sttr.__doc__.format(c=STTR_CHUNK)


_ORACLE_STTR = f"""
WITH arrs AS (
  SELECT doc_id,
         list_filter(string_split(lower(text), ' '), t -> t <> '') AS ts
  FROM documents
), pos AS (
  SELECT doc_id, CAST((u.p - 1) // {STTR_CHUNK} AS INTEGER) AS seg, ts[p] AS w
  FROM arrs, UNNEST(range(1, CAST(len(ts) AS BIGINT) + 1)) AS u(p)
), seg_stats AS (
  SELECT doc_id, seg,
         CAST(COUNT(*) AS BIGINT) AS n_tok,
         CAST(COUNT(DISTINCT w) AS BIGINT) AS n_typ
  FROM pos GROUP BY 1, 2
)
SELECT doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_segments,
       CAST(SUM(n_tok) AS BIGINT) AS n_tokens,
       {sql_fsum("CAST(n_typ AS DOUBLE) / CAST(n_tok AS DOUBLE)", scale=12)}
         / CAST(COUNT(*) AS DOUBLE) AS sttr
FROM seg_stats
GROUP BY doc_id
ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# Yule's K lexical-richness characteristic (round 10 wave 4)
# ---------------------------------------------------------------------------


def q_text_yules_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Yule's characteristic K per source: K = 10⁴·(Σ_w c_w² − N)/N² over
    the token frequency spectrum — the length-INVARIANT lexical-richness
    constant (TTR and hapax share both drift with corpus size; K is the
    repeat-rate statistic designed not to), and it is FULLY RATIONAL:
    unlike entropy-based diversity it needs no logarithms, so it fits the
    no-transcendentals gate contract natively. High K = repetitive
    template text; low K = rich vocabulary — the per-source screen next
    to ``text_sttr`` (segmented TTR) and ``text_hapax_ratio``.

    Exactness: Σc² is DECIMAL(38,0) (a 10¹⁰-count word contributes 10²⁰ —
    past bigint at 100 TB); K is one IEEE sequence on exact integers.
    Scale shape: one explode + (source, token) hash agg (map-side
    combinable) — the only data-sized stage — then a per-source agg over
    vocabulary-sized rows."""
    docs = load_table(spark, sf_dir, "documents").select("source", "text")
    tok = docs.select("source", F.explode(_tokens(F.col("text"))).alias("t"))
    counts = tok.groupBy("source", "t").agg(F.count(F.lit(1)).alias("cnt"))
    out = counts.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("vocab"),
        F.sum("cnt").cast("long").alias("n_tokens"),
        F.sum(F.col("cnt").cast("decimal(38,0)") * F.col("cnt").cast("decimal(38,0)"))
        .cast("decimal(38,0)")
        .alias("sc2"),
    )
    nd = F.col("n_tokens").cast("double")
    k = F.lit(1.0e4) * (F.col("sc2").cast("double") - nd) / (nd * nd)
    return out.select("source", "vocab", "n_tokens", k.alias("yules_k")).orderBy(
        "source"
    )



def q_text_renyi2_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rényi-2 (collision) entropy of each source's unigram distribution,
    in bits, with the EFFECTIVE VOCABULARY it exponentiates to — the
    entropy-family diversity number the no-transcendentals gate could
    not ship until round 11: H₂ = −log2 Σp² = log2(N²/Σc²), and
    ``functions/exact.with_exact_log2`` evaluates log2 with ONLY
    correctly-rounded IEEE ×/÷/compares (24-bit square-and-compare), so
    the gate hashes it bit-for-bit. H₂ lower-bounds Shannon entropy and
    is the collision-probability reading (how likely two random tokens
    coincide) — the diversity complement of ``text_yules_k`` (same Σc²
    moment, repeat-rate scaling) and the mixing signal
    ``source_mix_temperature`` weighs sources by.

    Exactness: Σc² exact in DECIMAL(38,0) (the yules frame); effective
    vocabulary N²/Σc² is one IEEE sequence on exact moments; log2 by
    spec-exact arithmetic. Scale shape: one explode + (source, token)
    hash agg — the only data-sized stage — then a |sources|-row chain
    of narrow projections (24, one per fraction bit)."""
    docs = load_table(spark, sf_dir, "documents").select("source", "text")
    tok = docs.select("source", F.explode(_tokens(F.col("text"))).alias("t"))
    counts = tok.groupBy("source", "t").agg(F.count(F.lit(1)).alias("cnt"))
    out = counts.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("vocab"),
        F.sum("cnt").cast("long").alias("n_tokens"),
        F.sum(F.col("cnt").cast("decimal(38,0)") * F.col("cnt").cast("decimal(38,0)"))
        .cast("decimal(38,0)")
        .alias("sc2"),
    )
    nd = F.col("n_tokens").cast("double")
    eff = out.select(
        "source",
        "vocab",
        "n_tokens",
        (nd * nd / F.col("sc2").cast("double")).alias("eff_vocab"),
    )
    logged = with_exact_log2(
        eff, "eff_vocab", "renyi2_bits", ["source", "vocab", "n_tokens"]
    )
    return logged.select(
        "source", "vocab", "n_tokens", "eff_vocab", "renyi2_bits"
    ).orderBy("source")


def _sql_renyi2() -> str:
    frag, final = sql_exact_log2_ctes(
        "eff", "eff_vocab", "renyi2_bits", ["source", "vocab", "n_tokens"]
    )
    return f"""
WITH tok AS (
  SELECT source, UNNEST({_sql_tokens("text")}) AS t FROM documents
), counts AS (
  SELECT source, t, COUNT(*) AS cnt FROM tok GROUP BY 1, 2
), outt AS (
  SELECT source,
         CAST(COUNT(*) AS BIGINT) AS vocab,
         CAST(SUM(cnt) AS BIGINT) AS n_tokens,
         CAST(SUM(CAST(cnt AS DECIMAL(38,0)) * CAST(cnt AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS sc2
  FROM counts GROUP BY 1
), eff AS (
  SELECT source, vocab, n_tokens,
         CAST(n_tokens AS DOUBLE) * CAST(n_tokens AS DOUBLE)
           / CAST(sc2 AS DOUBLE) AS eff_vocab
  FROM outt
){frag}
SELECT source, vocab, n_tokens, eff_vocab, renyi2_bits
FROM {final}
ORDER BY source
"""


_ORACLE_YULES_K = f"""
WITH tok AS (
  SELECT source, UNNEST({_sql_tokens("text")}) AS t FROM documents
), counts AS (
  SELECT source, t, COUNT(*) AS cnt FROM tok GROUP BY 1, 2
), outt AS (
  SELECT source,
         CAST(COUNT(*) AS BIGINT) AS vocab,
         CAST(SUM(cnt) AS BIGINT) AS n_tokens,
         CAST(SUM(CAST(cnt AS DECIMAL(38,0)) * CAST(cnt AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS sc2
  FROM counts GROUP BY 1
)
SELECT source, vocab, n_tokens,
       1e4 * (CAST(sc2 AS DOUBLE) - CAST(n_tokens AS DOUBLE))
         / (CAST(n_tokens AS DOUBLE) * CAST(n_tokens AS DOUBLE)) AS yules_k
FROM outt
ORDER BY source
"""


# ---------------------------------------------------------------------------
# Total-variation distance of each source's unigram mix vs the corpus
# ---------------------------------------------------------------------------


def q_text_tv_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Total-variation distance between each SOURCE's unigram
    distribution and the pooled corpus distribution — the log-free
    drift measure for pretraining-mix curation (KL and PSI need
    logarithms; TV = ½Σ|p − q| is fully rational AND is the tightest
    bound on how much any downstream event probability can differ).
    Rank sources by TV to find the one whose vocabulary least resembles
    the corpus (candidate for down-weighting or a dedicated mix bucket,
    the ``source_mix_temperature`` companion).

    Exact-integer formulation with NO zero-fill spine: over the common
    denominator N_s·N, Σ_t∈s |c_st·N − c_t·N_s| handles tokens the
    source HAS; tokens it lacks contribute exactly (N − Σ_t∈s c_t)·N_s,
    an identity on the same integers — so TV is (Σ|...| + (N−S_s)·N_s)
    / (2·N_s·N), ONE division. Products are DECIMAL(38,0) (c·N reaches
    ~10²⁵ at 100 TB). Scale shape: one explode + (source, token) hash
    agg, one token-level re-agg (vocabulary-sized), one vocab-sized
    join, per-source agg — every data-sized stage map-side combinable."""
    docs = load_table(spark, sf_dir, "documents").select("source", "text")
    tok = docs.select("source", F.explode(_tokens(F.col("text"))).alias("t"))
    counts = tok.groupBy("source", "t").agg(
        F.count(F.lit(1)).cast("long").alias("c_st")
    )
    pooled = counts.groupBy("t").agg(F.sum("c_st").cast("long").alias("c_t"))
    tot = counts.agg(F.sum("c_st").cast("long").alias("n_all"))
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    src_tot = counts.groupBy("source").agg(
        F.sum("c_st").cast("long").alias("n_src")
    )
    joined = (
        counts.join(pooled, "t")
        .join(F.broadcast(src_tot), "source")
        .crossJoin(F.broadcast(tot))
    )
    agg = joined.groupBy("source").agg(
        F.max("n_src").alias("n_src"),
        F.max("n_all").alias("n_all"),
        F.sum("c_t").cast("long").alias("covered_pool"),
        F.sum(
            F.abs(
                dec(F.col("c_st")) * dec(F.col("n_all"))
                - dec(F.col("c_t")) * dec(F.col("n_src"))
            )
        )
        .cast("decimal(38,0)")
        .alias("s_abs"),
    )
    num = F.col("s_abs").cast("double") + (
        (F.col("n_all") - F.col("covered_pool")).cast("double")
        * F.col("n_src").cast("double")
    )
    den = F.lit(2.0) * F.col("n_src").cast("double") * F.col("n_all").cast("double")
    return agg.select(
        "source",
        "n_src",
        (num / den).alias("tv_distance"),
    ).orderBy("source")


_ORACLE_TV_DISTANCE = f"""
WITH tok AS (
  SELECT source, UNNEST({_sql_tokens("text")}) AS t FROM documents
), counts AS (
  SELECT source, t, CAST(COUNT(*) AS BIGINT) AS c_st FROM tok GROUP BY 1, 2
), pooled AS (
  SELECT t, CAST(SUM(c_st) AS BIGINT) AS c_t FROM counts GROUP BY 1
), tot AS (SELECT CAST(SUM(c_st) AS BIGINT) AS n_all FROM counts),
src_tot AS (
  SELECT source, CAST(SUM(c_st) AS BIGINT) AS n_src FROM counts GROUP BY 1
), agg AS (
  SELECT counts.source,
         MAX(n_src) AS n_src,
         MAX(n_all) AS n_all,
         CAST(SUM(c_t) AS BIGINT) AS covered_pool,
         CAST(SUM(ABS(CAST(c_st AS DECIMAL(38,0)) * CAST(n_all AS DECIMAL(38,0))
                      - CAST(c_t AS DECIMAL(38,0)) * CAST(n_src AS DECIMAL(38,0)))) AS DECIMAL(38,0)) AS s_abs
  FROM counts
  JOIN pooled USING (t)
  JOIN src_tot ON counts.source = src_tot.source
  CROSS JOIN tot
  GROUP BY 1
)
SELECT source, n_src,
       (CAST(s_abs AS DOUBLE)
        + CAST(n_all - covered_pool AS DOUBLE) * CAST(n_src AS DOUBLE))
         / (2.0 * CAST(n_src AS DOUBLE) * CAST(n_all AS DOUBLE)) AS tv_distance
FROM agg
ORDER BY source
"""


# ---------------------------------------------------------------------------
# Gries' DP dispersion + Fano burstiness of the top corpus words (wave 10)
# ---------------------------------------------------------------------------

DISP_TOP_WORDS = 20  # the top-k corpus words both dispersion entries profile


def _top_words_cte(k: int) -> str:
    return f"""tok AS (
  SELECT source, doc_id, UNNEST({_sql_tokens("text")}) AS t FROM documents
), wcount AS (
  SELECT t, CAST(COUNT(*) AS BIGINT) AS c_w FROM tok GROUP BY 1
), top_words AS (
  SELECT t, c_w FROM (
    SELECT t, c_w, ROW_NUMBER() OVER (ORDER BY c_w DESC, t ASC) AS rn
    FROM wcount
  ) WHERE rn <= {k}
)"""


def q_text_gries_dp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gries' DP (deviation of proportions) for the top-{k} corpus
    words across SOURCES: DP_w = ½ Σ_s |share of w's tokens in source s
    − source s's share of all tokens| — the per-WORD dispersion measure
    (``text_tv_distance`` asks how far a SOURCE drifts from the corpus;
    DP asks which WORDS are corpus-wide vs locked to one source, the
    standard corpuslinguistics screen for topic-bound terms before
    trusting raw frequency). DP ≈ 0 = evenly spread, → 1 = one source.

    Exactness: over the common denominator c_w·N, each term is the
    integer |c_ws·N − n_s·c_w| (DECIMAL(38,0) products — c·N reaches
    ~10²⁵ at 100 TB); sources ABSENT a word contribute their exact n_s
    share, which the same closed form (N − Σ_covered n_s)·c_w supplies
    with no zero-fill spine. One division per word. Scale shape: one
    explode + (source, token) hash agg — the only data-sized stage;
    the top-k cut and per-word sums are vocabulary-sized."""
    docs = load_table(spark, sf_dir, "documents").select("source", "text")
    tok = docs.select("source", F.explode(_tokens(F.col("text"))).alias("t"))
    counts = tok.groupBy("source", "t").agg(
        F.count(F.lit(1)).cast("long").alias("c_ws")
    )
    wcount = counts.groupBy("t").agg(F.sum("c_ws").cast("long").alias("c_w"))
    top = (
        wcount.orderBy(F.col("c_w").desc(), F.col("t").asc())
        .limit(DISP_TOP_WORDS)
        .select("t", "c_w")
    )
    src_tot = counts.groupBy("source").agg(
        F.sum("c_ws").cast("long").alias("n_s")
    )
    tot = src_tot.agg(F.sum("n_s").cast("long").alias("n_all"))
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    joined = (
        counts.join(F.broadcast(top), "t")
        .join(F.broadcast(src_tot), "source")
        .crossJoin(F.broadcast(tot))
    )
    per_word = joined.groupBy("t").agg(
        F.max("c_w").alias("c_w"),
        F.max("n_all").alias("n_all"),
        F.sum("n_s").cast("long").alias("covered_ns"),
        F.sum(
            F.abs(dec(F.col("c_ws")) * dec(F.col("n_all"))
                  - dec(F.col("n_s")) * dec(F.col("c_w")))
        )
        .cast("decimal(38,0)")
        .alias("s_abs"),
    )
    num = F.col("s_abs").cast("double") + (
        (F.col("n_all") - F.col("covered_ns")).cast("double")
        * F.col("c_w").cast("double")
    )
    den = F.lit(2.0) * F.col("c_w").cast("double") * F.col("n_all").cast("double")
    return per_word.select(
        F.col("t").alias("word"),
        "c_w",
        (num / den).alias("gries_dp"),
    ).orderBy(F.col("c_w").desc(), F.col("word").asc())
q_text_gries_dp.__doc__ = q_text_gries_dp.__doc__ and q_text_gries_dp.__doc__.format(
        k=DISP_TOP_WORDS
    )


_ORACLE_GRIES_DP = f"""
WITH {_top_words_cte(DISP_TOP_WORDS)},
counts AS (
  SELECT source, t, CAST(COUNT(*) AS BIGINT) AS c_ws FROM tok GROUP BY 1, 2
), src_tot AS (
  SELECT source, CAST(SUM(c_ws) AS BIGINT) AS n_s FROM counts GROUP BY 1
), tot AS (SELECT CAST(SUM(n_s) AS BIGINT) AS n_all FROM src_tot),
per_word AS (
  SELECT counts.t,
         MAX(top_words.c_w) AS c_w,
         MAX(n_all) AS n_all,
         CAST(SUM(n_s) AS BIGINT) AS covered_ns,
         CAST(SUM(ABS(CAST(c_ws AS DECIMAL(38,0)) * CAST(n_all AS DECIMAL(38,0))
                      - CAST(n_s AS DECIMAL(38,0)) * CAST(top_words.c_w AS DECIMAL(38,0)))) AS DECIMAL(38,0)) AS s_abs
  FROM counts
  JOIN top_words ON counts.t = top_words.t
  JOIN src_tot ON counts.source = src_tot.source
  CROSS JOIN tot
  GROUP BY counts.t
)
SELECT t AS word, c_w,
       (CAST(s_abs AS DOUBLE)
        + CAST(n_all - covered_ns AS DOUBLE) * CAST(c_w AS DOUBLE))
         / (2.0 * CAST(c_w AS DOUBLE) * CAST(n_all AS DOUBLE)) AS gries_dp
FROM per_word
ORDER BY c_w DESC, word ASC
"""


def q_text_burstiness_fano(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fano factor (variance/mean of PER-DOCUMENT counts, zeros
    included) for the top-{k} corpus words — Church & Gale's burstiness:
    function words spread Poisson-like (Fano ≈ 1) while topical words
    clump into few documents (Fano ≫ 1). The content-word screen that
    needs no stopword list, and the complement of ``text_gries_dp``
    (dispersion across SOURCES vs concentration across DOCUMENTS).

    Exactness: with D docs and word total c, Fano = (D·Σc_d² − c²)
    / (D·c) — absent documents contribute 0 to Σc_d², so the closed
    form needs NO zero-fill spine; everything is integer (DECIMAL(38,0)
    squares) until one division. Scale shape: one explode + (doc, token)
    hash agg filtered to the broadcast top-k, then a per-word agg."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    n_docs = docs.agg(F.count(F.lit(1)).cast("long").alias("d"))
    tok = docs.select("doc_id", F.explode(_tokens(F.col("text"))).alias("t"))
    per_doc = tok.groupBy("t", "doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("c_d")
    )
    wcount = per_doc.groupBy("t").agg(F.sum("c_d").cast("long").alias("c_w"))
    top = (
        wcount.orderBy(F.col("c_w").desc(), F.col("t").asc())
        .limit(DISP_TOP_WORDS)
        .select("t", "c_w")
    )
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    stats = (
        per_doc.join(F.broadcast(top), "t")
        .groupBy("t")
        .agg(
            F.max("c_w").alias("c_w"),
            F.count(F.lit(1)).cast("long").alias("n_docs_with"),
            F.sum(dec(F.col("c_d")) * dec(F.col("c_d")))
            .cast("decimal(38,0)")
            .alias("sc2"),
        )
        .crossJoin(F.broadcast(n_docs))
    )
    dd = F.col("d").cast("double")
    cw = F.col("c_w").cast("double")
    fano = (dd * F.col("sc2").cast("double") - cw * cw) / (dd * cw)
    return stats.select(
        F.col("t").alias("word"),
        "c_w",
        "n_docs_with",
        fano.alias("fano_factor"),
    ).orderBy(F.col("c_w").desc(), F.col("word").asc())
q_text_burstiness_fano.__doc__ = q_text_burstiness_fano.__doc__ and q_text_burstiness_fano.__doc__.format(
        k=DISP_TOP_WORDS
    )


_ORACLE_FANO = f"""
WITH tok AS (
  SELECT doc_id, UNNEST({_sql_tokens("text")}) AS t FROM documents
), per_doc AS (
  SELECT t, doc_id, CAST(COUNT(*) AS BIGINT) AS c_d FROM tok GROUP BY 1, 2
), wcount AS (
  SELECT t, CAST(SUM(c_d) AS BIGINT) AS c_w FROM per_doc GROUP BY 1
), top_words AS (
  SELECT t, c_w FROM (
    SELECT t, c_w, ROW_NUMBER() OVER (ORDER BY c_w DESC, t ASC) AS rn
    FROM wcount
  ) WHERE rn <= {DISP_TOP_WORDS}
), n_docs AS (SELECT CAST(COUNT(*) AS BIGINT) AS d FROM documents),
stats AS (
  SELECT per_doc.t,
         MAX(top_words.c_w) AS c_w,
         CAST(COUNT(*) AS BIGINT) AS n_docs_with,
         CAST(SUM(CAST(c_d AS DECIMAL(38,0)) * CAST(c_d AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS sc2
  FROM per_doc JOIN top_words ON per_doc.t = top_words.t
  GROUP BY per_doc.t
)
SELECT t AS word, c_w, n_docs_with,
       (CAST(d AS DOUBLE) * CAST(sc2 AS DOUBLE)
        - CAST(c_w AS DOUBLE) * CAST(c_w AS DOUBLE))
         / (CAST(d AS DOUBLE) * CAST(c_w AS DOUBLE)) AS fano_factor
FROM stats CROSS JOIN n_docs
ORDER BY c_w DESC, word ASC
"""


# ---------------------------------------------------------------------------
# Moving-average type-token ratio (round 12)
# ---------------------------------------------------------------------------

MATTR_W = 50  # window width in tokens (the Covington-McFall standard 50)


def q_text_mattr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Moving-average type-token ratio (MATTR, Covington & McFall 2010)
    per document: the mean TTR over EVERY length-{w} sliding token
    window — the length-independent lexical-diversity standard that
    ``text_sttr`` (disjoint segments) approximates; MATTR uses all
    n−{w}+1 overlapping windows, so it has no segment-boundary
    variance.

    The naive computation is O(n·{w}) per doc (count distinct per
    window). This entry computes it EXACTLY in O(n) by inclusion-
    exclusion on PREVIOUS OCCURRENCES: token position j with previous
    occurrence p is a DUPLICATE precisely in windows whose start
    s ∈ [max(0, j−{w}+1), min(p, n−{w})] — a closed-form integer count
    per position — so Σ_windows distinct = {w}·(n−{w}+1) − Σ_j
    dup_windows(j), and MATTR is ONE division of exact integers. The
    previous occurrence itself is one LAG window over (doc, token).
    Docs shorter than {w} tokens are excluded (no full window — the
    reference treatment).

    Scale shape: one posexplode, one (doc_id, token)-keyed lag window,
    one doc-keyed agg — all partitioned by doc_id, no global windows,
    map-side combinable.

    Reference analog: none (engine addition, SURVEY.md §2.7)."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    pos = docs.select(
        "doc_id", F.posexplode(_tokens(F.col("text"))).alias("pos", "w")
    )
    w_tok = Window.partitionBy("doc_id", "w").orderBy("pos")
    w_doc = Window.partitionBy("doc_id")
    lagged = pos.select(
        "doc_id",
        F.col("pos").cast("long").alias("j"),
        F.lag("pos").over(w_tok).cast("long").alias("p"),
        F.count(F.lit(1)).over(w_doc).cast("long").alias("n"),
    ).filter(F.col("n") >= MATTR_W)
    wlit = F.lit(MATTR_W).cast("long")
    dup = F.when(
        F.col("p").isNotNull(),
        F.greatest(
            F.lit(0).cast("long"),
            F.least(F.col("p"), F.col("n") - wlit)
            - F.greatest(F.lit(0).cast("long"), F.col("j") - wlit + F.lit(1))
            + F.lit(1),
        ),
    ).otherwise(F.lit(0).cast("long"))
    per_doc = lagged.groupBy("doc_id").agg(
        F.max("n").alias("n_tokens"),
        F.sum(dup).cast("long").alias("dup_sum"),
    )
    n_win = F.col("n_tokens") - wlit + F.lit(1)
    return per_doc.select(
        "doc_id",
        "n_tokens",
        n_win.alias("n_windows"),
        (
            (wlit * n_win - F.col("dup_sum")).cast("double")
            / (wlit * n_win).cast("double")
        ).alias("mattr"),
    ).orderBy("doc_id")
q_text_mattr.__doc__ = q_text_mattr.__doc__ and q_text_mattr.__doc__.format(
        w=MATTR_W
    )


_ORACLE_MATTR = f"""
WITH arrs AS (
  SELECT doc_id, {_sql_tokens("text")} AS ts FROM documents
), pos AS (
  SELECT doc_id, CAST(u.p - 1 AS BIGINT) AS j, ts[p] AS w,
         CAST(len(ts) AS BIGINT) AS n
  FROM arrs, UNNEST(range(1, CAST(len(ts) AS BIGINT) + 1)) AS u(p)
), lagged AS (
  SELECT doc_id, j, n,
         LAG(j) OVER (PARTITION BY doc_id, w ORDER BY j) AS p
  FROM pos
), per_doc AS (
  SELECT doc_id, MAX(n) AS n_tokens,
         CAST(SUM(CASE WHEN p IS NOT NULL THEN
           GREATEST(0, LEAST(p, n - {MATTR_W}) - GREATEST(0, j - {MATTR_W} + 1) + 1)
         ELSE 0 END) AS BIGINT) AS dup_sum
  FROM lagged WHERE n >= {MATTR_W}
  GROUP BY doc_id
)
SELECT doc_id, n_tokens,
       CAST(n_tokens - {MATTR_W} + 1 AS BIGINT) AS n_windows,
       CAST({MATTR_W} * (n_tokens - {MATTR_W} + 1) - dup_sum AS DOUBLE)
         / CAST({MATTR_W} * (n_tokens - {MATTR_W} + 1) AS DOUBLE) AS mattr
FROM per_doc
ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# Chi-square keyword keyness (round 12)
# ---------------------------------------------------------------------------

CHI2_MIN_COUNT = 5  # vocab bound: tokens with a smaller corpus count drop
CHI2_TOP_K = 3  # keywords reported per source


def q_text_chi2_keyness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source keyword KEYNESS: the top {CHI2_TOP_K} overrepresented
    tokens per source by the 2×2 chi-square against the rest of the
    corpus — corpus-linguistics' keyness table (AntConc/WordSmith
    semantics), the per-SOURCE discriminative complement of
    ``text_tfidf_topk`` (per-doc) and ``text_dsir_proxy`` (global
    importance ratios). The usual statistic is log-likelihood G², which
    is transcendental (Σ O·ln(O/E)) and therefore banned here; the
    chi-square keyness variant is the standard rational alternative on
    the same 2×2 table and ranks near-identically in practice.

    Exactness: with a = token count in source, b = in rest, and
    row/column totals from one hash agg, χ² = N(ad−bc)² / ((a+b)(c+d)
    (a+c)(b+d)) — every product exact DECIMAL(38,0) (N(ad−bc)² ≤ N⁵:
    inside DECIMAL(38,0) to ~10⁷ corpus tokens; past that, lift the
    count floor), converted via the portable limb-split and divided
    ONCE, so the doubles (and hence the rank order) are engine-
    identical. Only overrepresented tokens (ad−bc > 0) qualify; ties
    break on token text. The vocabulary is bounded by the ≥
    {CHI2_MIN_COUNT} corpus-count floor (the repo's model-table
    convention). Division-by-zero is structurally impossible here (no
    guard needed, ADVICE r12 audit): the det > 0 filter implies
    a·d > b·c ≥ 0, so a > 0 and d > 0, hence ab ≥ a > 0, ac ≥ a > 0,
    n−ab = c+d > 0 and n−ac = b+d > 0 — all four factors of the
    denominator are strictly positive on every surviving row.

    Scale shape: one token explode → (source, token) hash agg →
    token-total and source-total reaggregations joined back (token
    totals by broadcast-sized vocab after the floor) → one
    per-source top-k window on the vocab-sized frame.

    Reference analog: none (engine addition, SURVEY.md §2.7)."""
    docs = load_table(spark, sf_dir, "documents").select("source", "text")
    tok = docs.select(
        "source", F.explode(_tokens(F.col("text"))).alias("w")
    )
    st = tok.groupBy("source", "w").agg(F.count(F.lit(1)).cast("long").alias("a"))
    tok_tot = (
        st.groupBy("w")
        .agg(F.sum("a").cast("long").alias("ab"))
        .filter(F.col("ab") >= CHI2_MIN_COUNT)
    )
    src_tot = st.groupBy("source").agg(F.sum("a").cast("long").alias("ac"))
    grand = st.agg(F.sum("a").cast("long").alias("n"))
    cells = (
        st.join(F.broadcast(tok_tot), "w")
        .join(F.broadcast(src_tot), "source")
        .crossJoin(F.broadcast(grand))
    )

    def dec(c):
        return c.cast("decimal(38,0)")

    a = F.col("a")
    b = F.col("ab") - a
    c = F.col("ac") - a
    d = F.col("n") - F.col("ab") - F.col("ac") + a
    det = dec(a) * dec(d) - dec(b) * dec(c)
    num = dec(F.col("n")) * det * det
    den = dec(F.col("ab")) * dec(F.col("n") - F.col("ab")) * dec(
        F.col("ac")
    ) * dec(F.col("n") - F.col("ac"))
    scored = cells.filter(det > 0).select(
        "source",
        "w",
        a.alias("a"),
        (dec_to_double(num) / dec_to_double(den)).alias("chi2"),
    )
    w_rank = Window.partitionBy("source").orderBy(F.desc("chi2"), F.asc("w"))
    return (
        scored.select(
            "source", "w", "a", "chi2", F.row_number().over(w_rank).alias("rk")
        )
        .filter(F.col("rk") <= CHI2_TOP_K)
        .select(
            "source",
            F.col("rk").cast("int").alias("rank"),
            F.col("w").alias("token"),
            F.col("a").alias("count_in_source"),
            "chi2",
        )
        .orderBy("source", "rank")
    )


_ORACLE_CHI2_KEYNESS = f"""
WITH tok AS (
  SELECT source, u.w AS w
  FROM documents, UNNEST({_sql_tokens("text")}) AS u(w)
), st AS (
  SELECT source, w, CAST(COUNT(*) AS BIGINT) AS a FROM tok GROUP BY 1, 2
), tok_tot AS (
  SELECT w, CAST(SUM(a) AS BIGINT) AS ab FROM st GROUP BY 1
  HAVING SUM(a) >= {CHI2_MIN_COUNT}
), src_tot AS (
  SELECT source, CAST(SUM(a) AS BIGINT) AS ac FROM st GROUP BY 1
), grand AS (SELECT CAST(SUM(a) AS BIGINT) AS n FROM st),
cells AS (
  SELECT st.source, st.w, st.a, tok_tot.ab, src_tot.ac, grand.n,
         CAST(st.a AS DECIMAL(38,0)) * CAST(grand.n - tok_tot.ab - src_tot.ac + st.a AS DECIMAL(38,0))
           - CAST(tok_tot.ab - st.a AS DECIMAL(38,0)) * CAST(src_tot.ac - st.a AS DECIMAL(38,0)) AS det
  FROM st JOIN tok_tot USING (w) JOIN src_tot USING (source) CROSS JOIN grand
), scored AS (
  SELECT source, w, a,
         {sql_dec_to_double("CAST(CAST(n AS DECIMAL(38,0)) * det * det AS DECIMAL(38,0))")}
           / {sql_dec_to_double("CAST(CAST(ab AS DECIMAL(38,0)) * CAST(n - ab AS DECIMAL(38,0)) * CAST(ac AS DECIMAL(38,0)) * CAST(n - ac AS DECIMAL(38,0)) AS DECIMAL(38,0))")} AS chi2
  FROM cells WHERE det > 0
), ranked AS (
  SELECT source, w, a, chi2,
         ROW_NUMBER() OVER (PARTITION BY source ORDER BY chi2 DESC, w ASC) AS rk
  FROM scored
)
SELECT source, CAST(rk AS INT) AS rank, w AS token,
       a AS count_in_source, chi2
FROM ranked WHERE rk <= {CHI2_TOP_K}
ORDER BY source, rank
"""


# ---------------------------------------------------------------------------
# Odds-ratio keyness (round 14)
# ---------------------------------------------------------------------------

ORK_TOP_K = 3
ORK_MIN_COUNT = 5


def q_text_odds_ratio_keyness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source keyword keyness by the HALDANE-CORRECTED odds ratio:
    OR = (a+½)(d+½) / ((b+½)(c+½)) on the same 2×2 source-vs-rest
    table as ``text_chi2_keyness``, top {k} per source. χ² ranks by
    statistical SURPRISE (frequency-inflated: a common token with a
    mild skew beats a rare token with a huge one); the odds ratio
    ranks by EFFECT SIZE — the corpus-linguistics pairing (Hardie
    2014's LogRatio is log₂ of exactly this quantity; the log is
    monotone, so ranking by OR is ranking by LogRatio without the
    banned transcendental). The ½-corrections make OR finite when a
    token never appears outside its source — precisely the strongest
    (and otherwise dropped) keyness evidence.

    Exactness: cell counts are the chi2_keyness hash aggs; with
    doubled cells A = 2a+1 etc., OR = (A·D)/(B·C) on exact
    DECIMAL(38,0) products, limb-converted and divided ONCE — the
    doubles and hence the rank order are engine-identical. Ranking is
    (OR desc, token asc), vocabulary floored at ≥ {m} corpus count.
    Only a > 0 cells qualify (a token absent from the source is not a
    keyword FOR it).

    Scale shape: the chi2_keyness shape — one explode, one (source,
    token) hash agg, broadcast-joined totals, one per-source top-k
    window on the floored-vocab frame.

    Reference analog: none (engine addition, SURVEY.md §2.7)."""
    docs = load_table(spark, sf_dir, "documents").select("source", "text")
    tok = docs.select("source", F.explode(_tokens(F.col("text"))).alias("w"))
    st = tok.groupBy("source", "w").agg(F.count(F.lit(1)).cast("long").alias("a"))
    tok_tot = (
        st.groupBy("w")
        .agg(F.sum("a").cast("long").alias("ab"))
        .filter(F.col("ab") >= ORK_MIN_COUNT)
    )
    src_tot = st.groupBy("source").agg(F.sum("a").cast("long").alias("ac"))
    grand = st.agg(F.sum("a").cast("long").alias("n"))
    cells = (
        st.join(F.broadcast(tok_tot), "w")
        .join(F.broadcast(src_tot), "source")
        .crossJoin(F.broadcast(grand))
    )

    def dec(c):
        return c.cast("decimal(38,0)")

    a = F.col("a")
    b = F.col("ab") - a
    c = F.col("ac") - a
    d = F.col("n") - F.col("ab") - c
    # doubled Haldane cells keep everything integral: x + 1/2 -> 2x + 1
    num = dec(F.lit(2) * a + 1) * dec(F.lit(2) * d + 1)
    den = dec(F.lit(2) * b + 1) * dec(F.lit(2) * c + 1)
    scored = cells.filter(a > 0).select(
        "source",
        "w",
        "a",
        (F.col("ab") - a).alias("b_rest"),
        (dec_to_double(num) / dec_to_double(den)).alias("odds_ratio"),
    )
    win = Window.partitionBy("source").orderBy(
        F.desc("odds_ratio"), F.asc("w")
    )
    return (
        scored.withColumn("rk", F.row_number().over(win))
        .filter(F.col("rk") <= ORK_TOP_K)
        .select("source", F.col("rk").alias("rank"), F.col("w").alias("token"),
                F.col("a").alias("count_in_source"), "b_rest", "odds_ratio")
        .orderBy("source", "rank")
    )


q_text_odds_ratio_keyness.__doc__ = q_text_odds_ratio_keyness.__doc__ and (
    q_text_odds_ratio_keyness.__doc__.format(k=ORK_TOP_K, m=ORK_MIN_COUNT)
)


def _sql_odds_ratio_keyness() -> str:
    num = (
        "CAST(2 * a + 1 AS DECIMAL(38,0))"
        " * CAST(2 * (n - ab - (ac - a)) + 1 AS DECIMAL(38,0))"
    )
    den = (
        "CAST(2 * (ab - a) + 1 AS DECIMAL(38,0))"
        " * CAST(2 * (ac - a) + 1 AS DECIMAL(38,0))"
    )
    return f"""
WITH tok AS (
  SELECT source, UNNEST({_sql_tokens("text")}) AS w FROM documents
), st AS (
  SELECT source, w, CAST(COUNT(*) AS BIGINT) AS a FROM tok GROUP BY 1, 2
), tok_tot AS (
  SELECT w, CAST(SUM(a) AS BIGINT) AS ab FROM st GROUP BY 1
  HAVING SUM(a) >= {ORK_MIN_COUNT}
), src_tot AS (
  SELECT source, CAST(SUM(a) AS BIGINT) AS ac FROM st GROUP BY 1
), grand AS (SELECT CAST(SUM(a) AS BIGINT) AS n FROM st),
scored AS (
  SELECT st.source, st.w, st.a,
         ab - st.a AS b_rest,
         {sql_dec_to_double(num)} / {sql_dec_to_double(den)} AS odds_ratio
  FROM st
  JOIN tok_tot USING (w)
  JOIN src_tot USING (source)
  CROSS JOIN grand
  WHERE st.a > 0
)
SELECT source, rank, token, count_in_source, b_rest, odds_ratio FROM (
  SELECT source, w AS token, a AS count_in_source, b_rest, odds_ratio,
         CAST(ROW_NUMBER() OVER (PARTITION BY source
                                 ORDER BY odds_ratio DESC, w ASC) AS BIGINT) AS rank
  FROM scored
) WHERE rank <= {ORK_TOP_K}
ORDER BY source, rank
"""


# ---------------------------------------------------------------------------
# Next-token branching Gini (round 14)
# ---------------------------------------------------------------------------

NGG_TOP_K = 15
NGG_MIN_CTX = 5


def q_text_ngram_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Next-token BRANCHING profile of the corpus: for the {k} most
    frequent word contexts (bigram first-words with ≥ {m} occurrences),
    the Gini impurity of the continuation distribution 1 − Σ(c_wv/c_w)²
    and the distinct-continuation count. Gini impurity is the RATIONAL
    branching measure (Shannon's branching entropy is the usual choice
    but needs ln; Gini is its quadratic sibling — 0 = deterministic
    continuation, →1 = uniform fan-out), and the word-level complement
    of ``text_bigram_lm_score``'s char model: templated/boilerplate
    text shows low-Gini contexts, which is a dedup/quality signal the
    per-doc scores miss.

    Exactness: bigram counts come from ONE per-doc token-array pair
    explode (two-word rows, not full-text rows — the
    ``text_bigram_lm_score`` shape note) and one hash agg; Σc² is an
    exact DECIMAL(38,0) sum, limb-converted, and each Gini is ONE IEEE
    division by the exact c_w². Ranking (c_w desc, context asc) is
    integer-deterministic.

    Scale shape: explode → (w1, w2) hash agg (vocab²-bounded) → vocab-
    bounded context rollup → one global top-k window on the floored
    context frame.

    Reference analog: none (engine addition, SURVEY.md §2.7)."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", _tokens(F.col("text")).alias("tk")
    )
    pairs = docs.select(
        F.explode(
            F.expr(
                "transform(sequence(1, size(tk) - 1),"
                " i -> named_struct('w1', tk[i - 1], 'w2', tk[i]))"
            )
        ).alias("p")
    ).select(F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2"))
    model = pairs.groupBy("w1", "w2").agg(
        F.count(F.lit(1)).cast("long").alias("c_wv")
    )
    ctx = model.groupBy("w1").agg(
        F.sum("c_wv").cast("long").alias("c_w"),
        F.count(F.lit(1)).cast("long").alias("n_cont"),
        F.sum((F.col("c_wv") * F.col("c_wv")).cast("decimal(38,0)"))
        .cast("decimal(38,0)")
        .alias("c2"),
    ).filter(F.col("c_w") >= NGG_MIN_CTX)
    gini = F.lit(1.0) - dec_to_double(F.col("c2")) / (
        F.col("c_w").cast("double") * F.col("c_w").cast("double")
    )
    win = Window.orderBy(F.desc("c_w"), F.asc("context"))
    return (
        ctx.select(
            F.col("w1").alias("context"),
            "c_w",
            "n_cont",
            gini.alias("gini_branching"),
        )
        .orderBy(F.desc("c_w"), F.asc("context"))
        .limit(NGG_TOP_K)
        .withColumn("rank", F.row_number().over(win))
        .select("rank", "context", "c_w", "n_cont", "gini_branching")
        .orderBy("rank")
    )


q_text_ngram_gini.__doc__ = q_text_ngram_gini.__doc__ and (
    q_text_ngram_gini.__doc__.format(k=NGG_TOP_K, m=NGG_MIN_CTX)
)


def _sql_ngram_gini() -> str:
    return f"""
WITH toks AS (
  SELECT doc_id, {_sql_tokens("text")} AS tk FROM documents
), pairs AS (
  SELECT tk[u.i] AS w1, tk[u.i + 1] AS w2
  FROM toks, UNNEST(range(1, len(tk))) AS u(i)
), model AS (
  SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS c_wv FROM pairs GROUP BY 1, 2
), ctx AS (
  SELECT w1,
         CAST(SUM(c_wv) AS BIGINT) AS c_w,
         CAST(COUNT(*) AS BIGINT) AS n_cont,
         CAST(SUM(CAST(c_wv * c_wv AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS c2
  FROM model GROUP BY 1
  HAVING SUM(c_wv) >= {NGG_MIN_CTX}
)
SELECT rank, context, c_w, n_cont, gini_branching FROM (
  SELECT w1 AS context, c_w, n_cont,
         1.0 - {sql_dec_to_double("c2")}
               / (CAST(c_w AS DOUBLE) * CAST(c_w AS DOUBLE)) AS gini_branching,
         CAST(ROW_NUMBER() OVER (ORDER BY c_w DESC, w1 ASC) AS BIGINT) AS rank
  FROM ctx
) WHERE rank <= {NGG_TOP_K}
ORDER BY rank
"""


QUERIES = {
    "text_odds_ratio_keyness": q_text_odds_ratio_keyness,
    "text_ngram_gini": q_text_ngram_gini,
    "text_mattr": q_text_mattr,
    "text_chi2_keyness": q_text_chi2_keyness,
    "text_yules_k": q_text_yules_k,
    "text_renyi2_entropy": q_text_renyi2_entropy,
    "text_gries_dp": q_text_gries_dp,
    "text_burstiness_fano": q_text_burstiness_fano,
    "text_tv_distance": q_text_tv_distance,
    "text_collocations_lift": q_text_collocations_lift,
    "benchmark_contamination": q_benchmark_contamination,
    "text_zipf_rankfreq": q_text_zipf_rankfreq,
    "text_ngram_novelty": q_text_ngram_novelty,
    "vocab_growth_curve": q_vocab_growth_curve,
    "text_token_count": q_text_token_count,
    "text_rarity_score": q_text_rarity_score,
    "text_quality": q_text_quality,
    "quality_filter_rules": q_quality_filter_rules,
    "text_langid": q_text_langid,
    "text_langid_confusion": q_text_langid_confusion,
    "text_fingerprint": q_text_fingerprint,
    "text_pii_redact": q_text_pii_redact,
    "text_tfidf_topk": q_text_tfidf_topk,
    "text_bm25_topk": q_text_bm25_topk,
    "text_vocab_encode": q_text_vocab_encode,
    "text_repetition": q_text_repetition,
    "text_ngram_top": q_text_ngram_top,
    "text_boilerplate": q_text_boilerplate,
    "sparse_allpairs_sim": q_sparse_allpairs_sim,
    "bpe_pair_counts": q_bpe_pair_counts,
    "cooccur_lift": q_cooccur_lift,
    "json_extract": q_json_extract,
    "text_chunk_overlap": q_text_chunk_overlap,
    "bpe_learn_merges": q_bpe_learn_merges,
    "retrieval_rrf_fusion": q_retrieval_rrf_fusion,
    "text_bigram_lm_score": q_text_bigram_lm_score,
    "text_rake_keywords": q_text_rake_keywords,
    "text_simpson_diversity": q_text_simpson_diversity,
    "text_readability_flesch": q_text_readability,
    "text_readability_panel": q_text_readability_panel,
    "text_vocab_gini": q_text_vocab_gini,
    "text_hapax_ratio": q_text_hapax_ratio,
    "text_textrank_keywords": q_text_textrank_keywords,
    "source_mix_temperature": q_source_mix_temperature,
    "source_lang_purity": q_source_lang_purity,
    "tokenizer_fertility": q_tokenizer_fertility,
    "text_dsir_proxy": q_text_dsir_proxy,
    "text_sttr": q_text_sttr,
    "text_burrows_delta": q_text_burrows_delta,
}

ORACLE = {
    "text_odds_ratio_keyness": _sql_odds_ratio_keyness(),
    "text_ngram_gini": _sql_ngram_gini(),
    "text_mattr": _ORACLE_MATTR,
    "text_chi2_keyness": _ORACLE_CHI2_KEYNESS,
    "text_yules_k": _ORACLE_YULES_K,
    "text_renyi2_entropy": _sql_renyi2(),
    "text_gries_dp": _ORACLE_GRIES_DP,
    "text_burstiness_fano": _ORACLE_FANO,
    "text_tv_distance": _ORACLE_TV_DISTANCE,
    "text_collocations_lift": _sql_collocations(),
    "benchmark_contamination": _sql_contamination(),
    "text_zipf_rankfreq": _sql_zipf(),
    "text_ngram_novelty": _ORACLE_TEXT_NGRAM_NOVELTY,
    "vocab_growth_curve": _ORACLE_VOCAB_GROWTH_CURVE,
    "text_token_count": _ORACLE_TEXT_TOKEN_COUNT,
    "text_rarity_score": _ORACLE_TEXT_RARITY,
    "text_quality": _ORACLE_TEXT_QUALITY,
    "quality_filter_rules": _sql_quality_filter_rules(),
    "text_langid": _sql_langid(),
    "text_langid_confusion": _sql_langid_confusion(),
    "text_fingerprint": _ORACLE_TEXT_FINGERPRINT,
    "text_pii_redact": _ORACLE_TEXT_PII_REDACT,
    "text_tfidf_topk": _ORACLE_TEXT_TFIDF_TOPK,
    "text_bm25_topk": _sql_bm25(),
    "text_vocab_encode": _ORACLE_TEXT_VOCAB_ENCODE,
    "text_repetition": _ORACLE_TEXT_REPETITION,
    "text_ngram_top": _ORACLE_TEXT_NGRAM_TOP,
    "text_boilerplate": _sql_boilerplate(),
    "sparse_allpairs_sim": _ORACLE_SPARSE_ALLPAIRS,
    "bpe_pair_counts": _ORACLE_BPE_PAIR_COUNTS,
    "cooccur_lift": _sql_cooccur_lift(),
    "json_extract": _ORACLE_JSON_EXTRACT,
    "text_chunk_overlap": _ORACLE_TEXT_CHUNK_OVERLAP,
    "bpe_learn_merges": _sql_bpe_learn_merges(),
    "retrieval_rrf_fusion": _sql_rrf_fusion(),
    "text_bigram_lm_score": _ORACLE_BIGRAM_LM,
    "text_rake_keywords": _sql_rake(),
    "text_simpson_diversity": _ORACLE_SIMPSON,
    "text_readability_flesch": _ORACLE_READABILITY,
    "text_readability_panel": _ORACLE_READABILITY_PANEL,
    "text_vocab_gini": _ORACLE_VOCAB_GINI,
    "text_hapax_ratio": _ORACLE_HAPAX,
    "text_textrank_keywords": _sql_textrank(),
    "source_mix_temperature": _sql_mix_temperature(),
    "source_lang_purity": _ORACLE_LANG_PURITY,
    "tokenizer_fertility": _ORACLE_FERTILITY,
    "text_dsir_proxy": _ORACLE_DSIR,
    "text_sttr": _ORACLE_STTR,
    "text_burrows_delta": _sql_burrows(),
}
