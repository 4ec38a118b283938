"""Round-5 advisor fixes: short-document guard for n-gram novelty and
Inf detection in the embedding norm audit.

ADVICE r4 found (1) q_text_ngram_novelty crashed on documents with fewer
than NOVELTY_N tokens — Spark's sequence(1, 0) descends to [1, 0] and
slice(toks, 0, 3) throws, while the DuckDB oracle's empty
generate_series succeeds, a latent Spark/oracle divergence the shipped
testdata never triggers; and (2) q_embedding_norm_audit's is_finite flag
only tested isnan, so ±Inf vectors (a real crashed-encoder failure mode)
counted as finite despite the column being named n_nonfinite."""

from __future__ import annotations

import os

import pytest

from us_flight_bigdata_dashboard_spark.operators.similarity import (
    q_embedding_norm_audit,
)
from us_flight_bigdata_dashboard_spark.operators.text import (
    NOVELTY_N,
    q_text_ngram_novelty,
)


@pytest.fixture(scope="module")
def short_docs_dir(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("shortdocs"))
    docs = [
        (0, "alpha beta gamma delta", "en", "s", 22),  # 4 tokens → 2 shingles
        (1, "alpha beta", "en", "s", 10),              # 2 tokens → 0 shingles
        (2, "solo", "en", "s", 4),                     # 1 token  → 0 shingles
        (3, "", "en", "s", 0),                         # empty    → 0 shingles
        (4, "alpha beta gamma", "en", "s", 16),        # exactly N → 1 shingle
    ]
    schema = "doc_id bigint, text string, lang string, source string, n_chars bigint"
    spark.createDataFrame(docs, schema).write.mode("overwrite").parquet(
        os.path.join(root, "documents.parquet")
    )
    return root


def test_ngram_novelty_survives_short_documents(spark, short_docs_dir):
    rows = {r["doc_id"]: r for r in q_text_ngram_novelty(spark, short_docs_dir).collect()}
    # Docs with < NOVELTY_N tokens contribute no shingles and drop out —
    # the DuckDB-oracle semantics (empty generate_series drops the doc).
    assert set(rows) == {0, 4}
    assert rows[0]["n_shingles"] == 2
    assert rows[4]["n_shingles"] == 1
    # Doc 0 owns both its shingles (doc_id order); doc 4's single shingle
    # "alpha beta gamma" first occurs in doc 0 → not novel.
    assert rows[0]["novelty"] == 1.0
    assert rows[4]["n_novel"] == 0 and rows[4]["novelty"] == 0.0
    assert NOVELTY_N == 3  # fixture token counts assume trigram shingles


@pytest.fixture(scope="module")
def bad_vecs_dir(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("badvecs"))
    inf, nan = float("inf"), float("nan")
    vecs = [
        (0, [1.0, 2.0, 2.0], "a"),
        (1, [inf, 1.0, 0.0], "a"),   # +Inf — must count as non-finite
        (2, [0.0, -inf, 1.0], "a"),  # −Inf — must count as non-finite
        (3, [nan, 0.0, 0.0], "a"),   # NaN
        (4, [0.0, 0.0, 0.0], "b"),   # zero vector, but finite
        (5, [3.0, 0.0, 4.0], "b"),
    ]
    schema = "vec_id bigint, embedding array<float>, label string"
    spark.createDataFrame(vecs, schema).write.mode("overwrite").parquet(
        os.path.join(root, "embeddings.parquet")
    )
    return root


def test_norm_audit_counts_inf_as_nonfinite(spark, bad_vecs_dir):
    rows = {r["label"]: r for r in q_embedding_norm_audit(spark, bad_vecs_dir).collect()}
    # +Inf, −Inf, and NaN vectors all flagged; the clean vector is not.
    assert rows["a"]["n_nonfinite"] == 3
    assert rows["b"]["n_nonfinite"] == 0
    assert rows["b"]["n_zero"] == 1
