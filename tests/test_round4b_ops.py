"""Round-4 continuation crafted tests: the Gopher-style rule-ensemble
quality filter (reason codes, rule precedence, NULL-ratio handling) and the
SemDeDup chain (embedding near-dup pairs → connected components → keeper)."""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq


def _write_documents(tmp_path, rows):
    """rows: list of (doc_id, text)."""
    tbl = pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows], pa.int64()),
            "text": pa.array([r[1] for r in rows], pa.string()),
            "lang": pa.array(["en"] * len(rows), pa.string()),
            "source": pa.array(["crafted"] * len(rows), pa.string()),
            "n_chars": pa.array([len(r[1]) for r in rows], pa.int64()),
        }
    )
    pq.write_table(tbl, str(tmp_path / "documents.parquet"))
    return str(tmp_path)


def _words(n, prefix="word"):
    return " ".join(f"{prefix}{i:03d}" for i in range(n))


def test_quality_filter_reason_codes(spark, tmp_path):
    """One document per rule branch: the filter must report the expected
    first-failing rule and keep flag for each."""
    from us_flight_bigdata_dashboard_spark.operators.text import (
        q_quality_filter_rules,
    )

    docs = [
        # 0: keeper — 33 distinct 7-char words + 'the ... of' (required
        # stopwords), mean word length in [3, 10], no symbols
        (0, "the " + _words(33) + " of"),
        # 1: too few words
        (1, "the tiny of doc"),
        # 2: repetitive — 40 words, only 2 distinct (+2 stopwords) → the
        # word-count/mean/symbol rules pass, distinct ratio 4/42 ≪ 0.4
        (2, "the of " + " ".join(["spam", "eggs"] * 20)),
        # 3: few stopwords — 35 distinct words, none from the required list
        (3, _words(35)),
        # 4: mean word length < 3 — 35 distinct 2-char words (+ 'of the');
        # precedence: also fails few-stopwords? no — 2 stopword kinds pass,
        # and distinct ratio is 1.0
        (4, "of the " + " ".join(f"w{i}" for i in range(10, 45))),
        # 5: empty text — zero tokens fails the word-count rule; ratios are
        # NULL and must not poison n_rules_failed
        (5, ""),
        # 6: precedence — 3 highly repetitive words fail BOTH word-count and
        # distinct-ratio; the FIRST rule (too_few_words) must win
        (6, "dup dup dup"),
    ]
    sf = _write_documents(tmp_path, docs)
    got = {
        r["doc_id"]: (r["fail_reason"], r["keep"], r["n_rules_failed"])
        for r in q_quality_filter_rules(spark, sf).collect()
    }
    assert got[0] == (None, 1, 0)
    assert got[1][0] == "too_few_words" and got[1][1] == 0
    assert got[2] == ("repetitive", 0, 1)
    assert got[3] == ("few_stopwords", 0, 1)
    assert got[4] == ("mean_word_len_out_of_range", 0, 1)
    assert got[5][0] == "too_few_words" and got[5][1] == 0
    # doc 6 fails word count AND distinct ratio AND stopword kinds;
    # first failing rule wins, all three are counted
    assert got[6] == ("too_few_words", 0, 3)


def _write_embeddings(tmp_path, vecs):
    """vecs: list of (vec_id, list[float])."""
    tbl = pa.table(
        {
            "vec_id": pa.array([v[0] for v in vecs], pa.int64()),
            "embedding": pa.array([v[1] for v in vecs], pa.list_(pa.float32())),
            "label": pa.array([0] * len(vecs), pa.int32()),
        }
    )
    pq.write_table(tbl, str(tmp_path / "embeddings.parquet"))
    return str(tmp_path)


def test_semantic_clusters_transitive_collapse(spark, tmp_path):
    """Two exact-duplicate groups and one singleton: the chain must emit one
    cluster per group labeled by the min vec_id, keeper = min, and the
    singleton (no near-dup pair) must be absent."""
    from us_flight_bigdata_dashboard_spark.operators.similarity import (
        q_dedup_semantic_clusters,
    )

    dim = 64
    def unit(axis, eps_axis=None, eps=0.0):
        v = [0.0] * dim
        v[axis] = 1.0
        if eps_axis is not None:
            v[eps_axis] = eps
        return v

    # group A: ids 10, 11, 12 — identical direction (cosine 1 > τ, and
    # identical vectors always share every LSH bucket); group B: ids 20,
    # 21 on a different axis; id 30: isolated direction
    vecs = [
        (10, unit(0)),
        (11, unit(0, 1, 1e-3)),
        (12, unit(0, 2, 1e-3)),
        (20, unit(5)),
        (21, unit(5, 6, 1e-3)),
        (30, unit(11)),
    ]
    sf = _write_embeddings(tmp_path, vecs)
    rows = q_dedup_semantic_clusters(spark, sf).collect()
    got = {r["vec_id"]: (r["cluster_id"], r["is_keeper"]) for r in rows}
    assert got == {
        10: (10, True),
        11: (10, False),
        12: (10, False),
        20: (20, True),
        21: (20, False),
    }


def test_semantic_clusters_matches_near_dup_pairs(spark):
    """On the real testdata the cluster labeling must be consistent with
    the pair generator: every emitted vec_id appears in some near-dup pair,
    and pair endpoints always share a cluster."""
    from us_flight_bigdata_dashboard_spark.operators.similarity import (
        q_dedup_semantic_clusters,
        q_embedding_near_dup,
    )

    sf = "/root/testdata/sf0.001"
    pairs = [
        (r["vec_a"], r["vec_b"]) for r in q_embedding_near_dup(spark, sf).collect()
    ]
    labels = {
        r["vec_id"]: r["cluster_id"]
        for r in q_dedup_semantic_clusters(spark, sf).collect()
    }
    in_pairs = {v for p in pairs for v in p}
    assert set(labels) == in_pairs
    for a, b in pairs:
        assert labels[a] == labels[b]
