"""Multimodal plumbing tests: binary payload column → Arrow-batched
mapInPandas decode; real-decode gate raises cleanly without PIL."""

from __future__ import annotations

import hashlib

import pytest

from us_flight_bigdata_dashboard_spark.operators.multimodal import (
    decode_image_real,
    media_from_documents,
    q_multimodal_features,
)

SF_DIR = "/root/testdata/sf0.001"


def test_payload_is_binary_and_pruned_schema(spark):
    media = media_from_documents(spark, SF_DIR)
    assert dict(media.dtypes)["payload"] == "binary"
    assert set(media.columns) == {"media_id", "kind", "payload"}


def test_decode_features_deterministic(spark):
    feats = q_multimodal_features(spark, SF_DIR)
    rows = feats.orderBy("media_id").limit(5).collect()
    docs = {r["media_id"]: r for r in rows}
    # independently recompute one row's features from the source text
    src = spark.read.parquet(f"{SF_DIR}/documents.parquet").filter("doc_id = 0").first()
    digest = hashlib.md5(src["text"].encode()).hexdigest()
    r = docs[0]
    assert r["digest"] == digest
    assert r["n_bytes"] == len(src["text"].encode())
    assert r["width"] == 64 + int(digest[:4], 16) % 960
    assert 64 <= r["height"] < 600 and 1 <= r["n_frames"] <= 30
    assert r["kind"] == "image"  # doc_id 0 → slot 1


def test_real_decode_gate_raises_without_pil():
    try:
        import PIL  # noqa: F401

        pytest.skip("PIL present in this environment")
    except ImportError:
        pass
    with pytest.raises(NotImplementedError, match="pillow"):
        decode_image_real(b"\x89PNG...")
