"""Positive-path PII redaction and TF-IDF tests on crafted documents (the
driver's synthetic corpus contains no PII, so the matrix entry only proves
the regexes agree across engines; these prove they actually *mask*)."""

from __future__ import annotations

import os

import pytest

from us_flight_bigdata_dashboard_spark.operators.text import (
    TFIDF_TOPK,
    q_text_pii_redact,
    q_text_tfidf_topk,
)


@pytest.fixture(scope="module")
def pii_dir(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("pii"))
    docs = [
        (0, "contact alice@example.com or bob.smith+x@sub.domain.org today", "en", "s", 60),
        (1, "call 415-555-1234 or 415.555.9876 about account 123456789", "en", "s", 57),
        (2, "no pii here just plain text", "en", "s", 27),
        # phone must be masked as one unit, not half-eaten by the long-number rule
        (3, "dial 800 555 0100 now", "en", "s", 21),
        (4, "", "en", "s", 0),
        # idf contrast corpus: 'zebra' unique to doc 5, 'plain' shared with doc 2
        (5, "zebra zebra zebra plain", "en", "s", 23),
    ]
    import pyspark.sql.types as T

    schema = "doc_id bigint, text string, lang string, source string, n_chars bigint"
    spark.createDataFrame(docs, schema).write.mode("overwrite").parquet(
        os.path.join(root, "documents.parquet")
    )
    return root


def test_pii_redact_masks_and_counts(spark, pii_dir):
    rows = {r["doc_id"]: r for r in q_text_pii_redact(spark, pii_dir).collect()}
    assert rows[0]["n_emails"] == 2 and rows[0]["n_phones"] == 0
    assert rows[1]["n_phones"] == 2 and rows[1]["n_longnums"] == 1
    assert rows[2]["n_emails"] == rows[2]["n_phones"] == rows[2]["n_longnums"] == 0
    # spaced phone consumed by the phone rule, not split into digit runs
    assert rows[3]["n_phones"] == 1 and rows[3]["n_longnums"] == 0
    assert rows[4]["redacted_len"] == 0


def test_pii_redact_digest_changes_only_when_masked(spark, pii_dir):
    from pyspark.sql import functions as F

    docs = spark.read.parquet(os.path.join(pii_dir, "documents.parquet"))
    orig = {r["doc_id"]: r["d"] for r in docs.select("doc_id", F.md5("text").alias("d")).collect()}
    red = {r["doc_id"]: r["redacted_digest"] for r in q_text_pii_redact(spark, pii_dir).collect()}
    assert red[2] == orig[2]  # clean doc untouched
    assert red[0] != orig[0] and red[1] != orig[1]  # masked docs rewritten


def test_tfidf_ranks_rare_terms_first(spark, pii_dir):
    rows = [r for r in q_text_tfidf_topk(spark, pii_dir).collect() if r["doc_id"] == 5]
    assert rows and rows[0]["term"] == "zebra"  # tf=3, df=1 → top salience
    assert all(r["rk"] <= TFIDF_TOPK for r in rows)
    by_term = {r["term"]: r for r in rows}
    assert by_term["zebra"]["salience"] > by_term["plain"]["salience"]
