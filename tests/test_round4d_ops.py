"""Crafted tests: takedown propagation receipts and the cross-source
overlap matrix."""

from __future__ import annotations

import hashlib

import pyarrow as pa
import pyarrow.parquet as pq


def _md5_bucket(doc_id: int) -> int:
    return int(hashlib.md5(str(doc_id).encode()).hexdigest()[:15], 16) % 100


def _write_docs_and_embeddings(tmp_path, rows, emb_ids):
    tbl = pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows], pa.int64()),
            "text": pa.array([r[1] for r in rows], pa.string()),
            "lang": pa.array(["en"] * len(rows), pa.string()),
            "source": pa.array([r[2] for r in rows], pa.string()),
            "n_chars": pa.array([len(r[1]) for r in rows], pa.int64()),
        }
    )
    pq.write_table(tbl, str(tmp_path / "documents.parquet"))
    etbl = pa.table(
        {
            "vec_id": pa.array(emb_ids, pa.int64()),
            "embedding": pa.array([[0.0] * 64 for _ in emb_ids], pa.list_(pa.float32())),
            "label": pa.array([0] * len(emb_ids), pa.int32()),
        }
    )
    pq.write_table(etbl, str(tmp_path / "embeddings.parquet"))
    return str(tmp_path)


def test_takedown_receipt_counts(spark, tmp_path):
    """The audit receipt must balance (before = removed + after) and match
    the python-replicated md5 bucket membership — including an embedding
    table that only PARTIALLY overlaps the removal list."""
    from us_flight_bigdata_dashboard_spark.operators.mutation import (
        TAKEDOWN_PCT,
        q_takedown_propagation,
    )

    doc_ids = list(range(200))
    emb_ids = list(range(100, 300))  # half overlap with docs
    sf = _write_docs_and_embeddings(
        tmp_path, [(i, f"text {i}", "s") for i in doc_ids], emb_ids
    )
    flagged = {i for i in doc_ids if _md5_bucket(i) < TAKEDOWN_PCT}
    got = {r["table_name"]: r for r in q_takedown_propagation(spark, sf).collect()}
    d = got["documents"]
    assert (d["n_before"], d["n_removed"]) == (200, len(flagged))
    assert d["n_before"] == d["n_removed"] + d["n_after"]
    e = got["embeddings"]
    # only flagged ids that exist in the embedding key range cascade
    assert e["n_removed"] == len([i for i in flagged if i in set(emb_ids)])
    assert e["n_before"] == e["n_removed"] + e["n_after"]


def test_source_overlap_counts_shared_shingles(spark, tmp_path):
    """Two sources sharing exactly one 8-gram (and a third sharing none)
    must produce exactly one matrix row with the hand-computed containment
    coefficient."""
    from us_flight_bigdata_dashboard_spark.operators.dedup import (
        q_source_overlap_matrix,
    )

    shared = " ".join(f"c{i}" for i in range(8))       # one shared 8-gram
    docs = [
        (0, shared + " " + " ".join(f"a{i}" for i in range(4)), "sa"),
        (1, shared + " " + " ".join(f"b{i}" for i in range(8)), "sb"),
        (2, " ".join(f"z{i}" for i in range(12)), "sc"),
    ]
    tbl_path = _write_docs_and_embeddings(tmp_path, docs, [0])
    rows = q_source_overlap_matrix(spark, tbl_path).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r["source_a"], r["source_b"]) == ("sa", "sb")
    # sa: 12 tokens -> 5 distinct shingles; sb: 16 tokens -> 9; shared: 1
    assert r["n_shared_shingles"] == 1
    assert r["overlap_coef"] == 1.0 / 5.0


import re

from hypothesis import given, settings
from hypothesis import strategies as st


_VOCAB = [
    "the", "of", "and", "to", "a", "is", "in", "that",
    "word", "wordy", "lexeme", "q", "zz", "abcdefghijk",
    "###", "!!", "12345", "x9", "spam", "eggs",
]


def _py_quality_rules(text):
    """Python replica of the rule cascade — same tokenizer (single-space
    split, empties dropped), same integer counts, same IEEE divisions."""
    from us_flight_bigdata_dashboard_spark.operators.text import (
        QF_MAX_SYMBOL_RATIO,
        QF_MAX_WORDS,
        QF_MEAN_WORD_LEN_MAX,
        QF_MEAN_WORD_LEN_MIN,
        QF_MIN_DISTINCT_RATIO,
        QF_MIN_STOPWORD_KINDS,
        QF_MIN_WORDS,
        QF_REQUIRED_STOPWORDS,
    )

    toks = [t for t in text.lower().split(" ") if t != ""]
    n = len(toks)
    mean_wl = (sum(len(t) for t in toks) / n) if n else None
    n_sym = len(re.sub(r"[A-Za-z0-9\s]", "", text))
    sym_ratio = (n_sym / len(text)) if len(text) else None
    distinct_ratio = (len(set(toks)) / n) if n else None
    stop_kinds = sum(1 for w in QF_REQUIRED_STOPWORDS if w in toks)
    conds = [
        ("too_few_words", n < QF_MIN_WORDS),
        ("too_many_words", n > QF_MAX_WORDS),
        (
            "mean_word_len_out_of_range",
            mean_wl is not None
            and (mean_wl < QF_MEAN_WORD_LEN_MIN or mean_wl > QF_MEAN_WORD_LEN_MAX),
        ),
        ("symbol_ratio_high", sym_ratio is not None and sym_ratio > QF_MAX_SYMBOL_RATIO),
        ("repetitive", distinct_ratio is not None and distinct_ratio < QF_MIN_DISTINCT_RATIO),
        ("few_stopwords", stop_kinds < QF_MIN_STOPWORD_KINDS),
    ]
    reason = next((name for name, c in conds if c), None)
    n_failed = sum(1 for _, c in conds if c)
    return reason, n_failed


@settings(max_examples=8, deadline=None)
@given(
    st.lists(
        st.lists(st.sampled_from(_VOCAB), min_size=0, max_size=50).map(" ".join),
        min_size=1,
        max_size=12,
    )
)
def test_quality_filter_matches_python_replica(spark, tmp_path_factory, texts):
    """Property: for arbitrary token soups, the Spark rule cascade agrees
    with an exact Python replica on (first failing rule, failed count,
    keep), and keep == 1 exactly when no rule failed."""
    from us_flight_bigdata_dashboard_spark.operators.text import (
        q_quality_filter_rules,
    )

    tmp = tmp_path_factory.mktemp("qfprop")
    sf = _write_docs_and_embeddings(
        tmp, [(i, t, "s") for i, t in enumerate(texts)], [0]
    )
    got = {
        r["doc_id"]: (r["fail_reason"], r["n_rules_failed"], r["keep"])
        for r in q_quality_filter_rules(spark, sf).collect()
    }
    for i, t in enumerate(texts):
        reason, n_failed = _py_quality_rules(t)
        assert got[i] == (reason, n_failed, int(reason is None)), (i, t)


def test_operators_survive_empty_corpus(spark, tmp_path):
    """An empty snapshot (0-row tables, real schemas) must yield empty
    results everywhere — not driver crashes. Covers the index trainers
    (IVF/PQ/k-means: empty corpus → no index → empty typed result while
    partial-id gaps still raise), the iterative fixed points, and the
    new round-4 operators."""
    import os

    import pyarrow.parquet as pq_mod

    from us_flight_bigdata_dashboard_spark.registry import queries

    src = "/root/testdata/sf0.001"
    for f in os.listdir(src):
        t = pq_mod.read_table(os.path.join(src, f))
        pq_mod.write_table(t.slice(0, 0), str(tmp_path / f))
    sf = str(tmp_path)

    qs = queries()
    probe = [
        "ann_ivf", "ann_pq", "kmeans_clusters", "ann_recall_eval",
        "dedup_minhash_lsh", "dedup_clusters", "dedup_clusters_ls",
        "dedup_semantic_clusters", "embedding_pca_power", "graph_pagerank",
        "bpe_learn_merges", "quality_filter_rules", "token_budget_fill",
        "drift_binned", "embedding_outlier_detect", "source_overlap_matrix",
        "events_ewma", "events_twap", "curation_pipeline", "merge_upsert",
    ]
    for name in probe:
        rows = qs[name](spark, sf).collect()
        if name == "takedown_propagation":
            continue  # audit receipts are per-table rows even when empty
        assert rows == [], f"{name} returned rows on an empty corpus"


def test_curate_cli_end_to_end(spark, tmp_path, capsys):
    """The curate subcommand must write split-partitioned parquet plus a
    balanced audit line (input = kept-after-rules + per-reason drops;
    dedup keeps <= kept; split sizes sum to the final count)."""
    import json as json_mod

    from us_flight_bigdata_dashboard_spark.__main__ import main

    out = str(tmp_path / "curated")
    rc = main(["curate", "--sf-dir", "/root/testdata/sf0.001", "--out", out])
    assert rc == 0
    audit = json_mod.loads(capsys.readouterr().out.strip().splitlines()[-1])
    dropped = sum(v for k, v in audit["drop_reasons"].items() if k != "kept")
    assert audit["n_input"] == audit["drop_reasons"].get("kept", 0) + dropped
    assert audit["n_after_dedup"] <= audit["drop_reasons"].get("kept", 0)
    assert sum(audit["splits"].values()) == audit["n_after_dedup"]
    got = spark.read.parquet(f"{out}/documents")
    assert got.count() == audit["n_after_dedup"]
    assert set(r["split"] for r in got.select("split").distinct().collect()) <= {
        "train", "valid", "test"
    }
