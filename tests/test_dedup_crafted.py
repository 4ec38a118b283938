"""Positive-path dedup/similarity tests on crafted data (the driver tables
contain no true duplicates, so these prove the operators actually *find*
what they claim to find)."""

from __future__ import annotations

import os

import pytest

from us_flight_bigdata_dashboard_spark.operators.dedup import (
    MAX_SHINGLE_DF,
    q_dedup_clusters,
    q_dedup_exact,
    q_dedup_keep_best,
    q_dedup_minhash_lsh,
    q_dedup_ngram_jaccard,
    q_dedup_simhash,
)
from us_flight_bigdata_dashboard_spark.operators.similarity import (
    NEAR_DUP_BANDS,
    _plane_weights,
    q_embedding_near_dup,
    q_knn_bruteforce,
)

BASE = (
    "the quick brown fox jumps over the lazy dog while the cat watches the "
    "bird and the dog barks at the mailman every single morning before dawn "
    "breaks over the quiet suburban neighborhood streets"
)


@pytest.fixture(scope="module")
def crafted_dir(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("crafted"))
    docs = [
        (0, BASE, "en", "src0", len(BASE)),
        (1, BASE, "en", "src1", len(BASE) + 5),  # exact dup of 0, longest metadata
        (2, BASE.replace("mailman", "postman"), "en", "src0", len(BASE)),  # near-dup of 0
        (3, "completely unrelated text about quantum chromodynamics and lattice gauge theory simulations", "en", "src2", 93),
        (4, "short doc", "en", "src3", 9),
    ]
    spark.createDataFrame(
        docs, "doc_id bigint, text string, lang string, source string, n_chars bigint"
    ).write.mode("overwrite").parquet(os.path.join(root, "documents.parquet"))

    base_vec = [float((i * 37 % 19) - 9) / 10.0 for i in range(64)]
    near = list(base_vec)
    near[0] += 0.001
    far = [float((i * 17 % 23) - 11) / 10.0 for i in range(64)]
    vecs = [(0, base_vec, 0), (1, list(base_vec), 0), (2, near, 0), (3, far, 1)]
    spark.createDataFrame(vecs, "vec_id bigint, embedding array<float>, label int").write.mode(
        "overwrite"
    ).parquet(os.path.join(root, "embeddings.parquet"))
    return root


def test_exact_dedup_groups_duplicates(spark, crafted_dir):
    rows = q_dedup_exact(spark, crafted_dir).collect()
    by_keeper = {r["keep_doc_id"]: r["n_copies"] for r in rows}
    assert by_keeper[0] == 2  # docs 0 and 1 collapse, keeper is min id
    assert len(rows) == 4


def test_minhash_lsh_finds_near_dup(spark, crafted_dir):
    pairs = {(r["doc_a"], r["doc_b"]): r["n_shared_bands"] for r in q_dedup_minhash_lsh(spark, crafted_dir).collect()}
    assert pairs[(0, 1)] == 4  # identical docs share every band
    assert (0, 2) in pairs or (1, 2) in pairs  # one-word change caught by ≥1 band
    assert not any(3 in p for p in pairs)  # unrelated doc never a candidate


def test_ngram_jaccard_ranks_near_dup_highest(spark, crafted_dir):
    rows = q_dedup_ngram_jaccard(spark, crafted_dir).collect()
    assert (rows[0]["doc_a"], rows[0]["doc_b"], rows[0]["jaccard"]) == (0, 1, 1.0)
    near = next(r for r in rows if {r["doc_a"], r["doc_b"]} == {0, 2})
    assert 0.5 < near["jaccard"] < 1.0


def test_simhash_signature_distance(spark, crafted_dir):
    sigs = {r["doc_id"]: r["simhash16"] for r in q_dedup_simhash(spark, crafted_dir).collect()}
    assert sigs[0] == sigs[1]
    ham_near = sum(a != b for a, b in zip(sigs[0], sigs[2]))
    ham_far = sum(a != b for a, b in zip(sigs[0], sigs[3]))
    assert ham_near <= 2 < ham_far


def test_clusters_collapse_transitive_duplicates(spark, crafted_dir):
    # docs 0,1 are exact dups and 2 is a near-dup of them: even if LSH only
    # ever paired (0,1) and (0,2), connected components must put all three
    # in ONE cluster with a single keeper (min id)
    rows = {r["doc_id"]: r for r in q_dedup_clusters(spark, crafted_dir).collect()}
    assert set(rows) == {0, 1, 2}  # docs 3,4 are in no candidate pair
    assert all(rows[d]["cluster_id"] == 0 for d in (0, 1, 2))
    assert [d for d in rows if rows[d]["is_keeper"]] == [0]


def test_keep_best_prefers_longest_copy(spark, crafted_dir):
    # docs 0,1,2 form one cluster; min-id clustering keeps 0, but the
    # quality-aware stage must keep doc 1 (largest n_chars metadata)
    rows = {r["cluster_id"]: r for r in q_dedup_keep_best(spark, crafted_dir).collect()}
    assert rows[0]["keep_doc_id"] == 1
    assert rows[0]["n_docs"] == 3
    assert rows[0]["keep_n_chars"] == len(BASE) + 5


@pytest.fixture(scope="module")
def hot_shingle_dir(spark, tmp_path_factory):
    """MAX_SHINGLE_DF+10 docs that share ONLY one stop-phrase shingle, plus
    one genuine near-dup pair on rare shingles."""
    root = str(tmp_path_factory.mktemp("hotshingle"))
    n_hot = MAX_SHINGLE_DF + 10
    docs = [
        (i, f"the quick brown unique{i} token{i} extra{i}", "en", "hot", 40)
        for i in range(n_hot)
    ]
    docs.append((1000, "rare shared phrase occurs here exactly once", "en", "rare", 43))
    docs.append((1001, "rare shared phrase occurs here exactly twice", "en", "rare", 44))
    spark.createDataFrame(
        docs, "doc_id bigint, text string, lang string, source string, n_chars bigint"
    ).write.mode("overwrite").parquet(os.path.join(root, "documents.parquet"))
    return root


def test_jaccard_df_cap_blocks_stop_phrase_blowup(spark, hot_shingle_dir):
    # every hot doc shares the shingle "the quick brown" (df = 60 > cap):
    # without the DF cap the self-join would emit C(60,2) = 1770 hot-only
    # pairs and the top-20 would be all noise; with it only the genuine
    # rare-shingle pair survives
    rows = q_dedup_ngram_jaccard(spark, hot_shingle_dir).collect()
    pairs = {(r["doc_a"], r["doc_b"]) for r in rows}
    assert (1000, 1001) in pairs
    assert not any(a < 1000 and b < 1000 for a, b in pairs), pairs


def _py_bucket(vec, planes):
    rows = _plane_weights(max(planes) + 1)
    bits = []
    for p in planes:
        proj = 0.0
        for x, w in zip(vec, rows[p]):
            proj += x * w
        bits.append("1" if proj >= 0 else "0")
    return "".join(bits)


@pytest.fixture(scope="module")
def band_straddle_dir(spark, tmp_path_factory):
    """A near-dup pair built to straddle a band-0 hyperplane: project a
    generic vector onto plane 0's orthogonal complement, then nudge ±eps
    along the plane normal. Band-0 buckets differ (bit 0 flips), band-1
    buckets match — only the multi-band union can pair them."""
    root = str(tmp_path_factory.mktemp("bandstraddle"))
    w0 = _plane_weights(1)[0]
    x = [((i * 37 % 19) - 9) / 10.0 for i in range(64)]
    p = sum(xi * wi for xi, wi in zip(x, w0)) / 64.0
    u = [xi - p * wi for xi, wi in zip(x, w0)]
    eps = 0.001
    a = [ui + eps * wi for ui, wi in zip(u, w0)]
    b = [ui - eps * wi for ui, wi in zip(u, w0)]
    assert _py_bucket(a, NEAR_DUP_BANDS[0]) != _py_bucket(b, NEAR_DUP_BANDS[0])
    assert _py_bucket(a, NEAR_DUP_BANDS[1]) == _py_bucket(b, NEAR_DUP_BANDS[1])
    spark.createDataFrame(
        [(0, a, 0), (1, b, 0)], "vec_id bigint, embedding array<float>, label int"
    ).write.mode("overwrite").parquet(os.path.join(root, "embeddings.parquet"))
    return root


def test_multiband_recovers_boundary_straddling_pair(spark, band_straddle_dir):
    rows = q_embedding_near_dup(spark, band_straddle_dir).collect()
    assert [(r["vec_a"], r["vec_b"]) for r in rows] == [(0, 1)]
    assert rows[0]["cosine_sim"] >= 0.99


def test_embedding_near_dup_and_knn(spark, crafted_dir):
    dups = {(r["vec_a"], r["vec_b"]): r["cosine_sim"] for r in q_embedding_near_dup(spark, crafted_dir).collect()}
    assert dups[(0, 1)] == pytest.approx(1.0)
    assert (0, 2) in dups  # tiny perturbation ≥ 0.99
    assert not any(3 in p for p in dups)
    knn = q_knn_bruteforce(spark, crafted_dir).collect()
    top = {r["query_id"]: r["neighbor_id"] for r in knn if r["rank"] == 1}
    assert top[0] == 1  # exact duplicate is rank-1 (tie broken by id)


def test_chunk_dedup_marks_exact_dup_chunks(spark, crafted_dir):
    from us_flight_bigdata_dashboard_spark.operators.dedup import q_dedup_chunks

    rows = {r["doc_id"]: r for r in q_dedup_chunks(spark, crafted_dir).collect()}
    # doc 1 is an exact copy of doc 0: every chunk is a duplicate of doc
    # 0's canonical occurrence → nothing retained
    assert rows[1]["n_dup_chunks"] == rows[1]["n_chunks"]
    assert rows[1]["retained_frac"] == 0.0
    # doc 0 holds the canonical occurrences → fully retained
    assert rows[0]["n_dup_chunks"] == 0 and rows[0]["retained_frac"] == 1.0
