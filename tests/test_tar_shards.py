"""Crafted tests for the WebDataset tar-shard container (operators/
tar_shards.py). The exact gate proves text round-trips; these pin the
CONTAINER against the outside world and its failure modes: stdlib
``tarfile`` interop in BOTH directions, header checksum verification,
pairing/adjacency violations, 512-block padding edges, and unicode."""

from __future__ import annotations

import io
import json
import tarfile

import pandas as pd
import pytest

from us_flight_bigdata_dashboard_spark.operators import tar_shards as TS


def _pack(rows):
    pdf = pd.DataFrame(rows, columns=["doc_id", "shard", "text", "lang", "source"])
    return TS.make_tar_packer()(pdf)


def _read(packed):
    return next(TS.make_tar_reader()(iter([packed])))


_ROWS = [
    (3, 3, "hello wörld", "en", "web"),
    (11, 3, "", "de", "web"),  # empty payload: zero data blocks
    (19, 3, "x" * 512, "en", "books"),  # exactly one block, no padding
    (27, 3, "y" * 513, "en", "books"),  # block + 1: max padding
]


def test_stdlib_tarfile_reads_our_archives():
    """Interop out: Python's tarfile must accept our ustar bytes."""
    payload = _pack(_ROWS).payload[0]
    tf = tarfile.open(fileobj=io.BytesIO(payload))
    names = tf.getnames()
    assert names[:2] == ["000000003.txt", "000000003.json"]
    assert tf.extractfile("000000003.txt").read().decode() == "hello wörld"
    assert len(tf.extractfile("000000027.txt").read()) == 513
    meta = json.loads(tf.extractfile("000000019.json").read())
    assert meta == {"doc_id": 19, "lang": "en", "source": "books"}


def test_our_reader_reads_stdlib_archives():
    """Interop in: archives produced by tarfile itself must parse."""
    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w", format=tarfile.USTAR_FORMAT) as tf:
        for base, text in [("000000005", "abc"), ("000000009", "défg")]:
            data = text.encode()
            info = tarfile.TarInfo(base + ".txt")
            info.size = len(data)
            tf.addfile(info, io.BytesIO(data))
            meta = json.dumps({"doc_id": int(base)}).encode()
            info = tarfile.TarInfo(base + ".json")
            info.size = len(meta)
            tf.addfile(info, io.BytesIO(meta))
    packed = pd.DataFrame({"shard": [1], "payload": [buf.getvalue()], "n_members": [4]})
    dec = _read(packed)
    assert list(dec.doc_id) == [5, 9]
    assert list(dec.n_chars) == [3, 4]  # chars, not bytes (é)
    assert all(dec.meta_ok)


def test_padding_edges_roundtrip():
    dec = _read(_pack(_ROWS))
    by_id = {int(r.doc_id): r for _, r in dec.iterrows()}
    assert by_id[11].n_chars == 0
    assert by_id[19].n_chars == 512
    assert by_id[27].n_chars == 513


def test_checksum_corruption_detected():
    packed = _pack(_ROWS)
    b = bytearray(bytes(packed.payload[0]))
    b[0] ^= 0x01  # flip a name byte → header checksum no longer matches
    with pytest.raises(ValueError, match="checksum"):
        _read(pd.DataFrame({"shard": [3], "payload": [bytes(b)], "n_members": [8]}))


def test_broken_pairing_detected():
    """Drop one member (the first .txt) → its .json leads and pairing
    breaks."""
    payload = bytes(_pack(_ROWS).payload[0])
    tf = tarfile.open(fileobj=io.BytesIO(payload))
    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w", format=tarfile.USTAR_FORMAT) as out:
        for m in tf.getmembers()[1:]:
            out.addfile(m, tf.extractfile(m))
    with pytest.raises(ValueError, match="pairing|basenames|odd member"):
        _read(pd.DataFrame({"shard": [3], "payload": [buf.getvalue()], "n_members": [7]}))


def test_spark_end_to_end_all_docs_once(spark):
    df = TS.q_webdataset_tar_roundtrip(spark, "/root/testdata/sf0.001")
    rows = df.collect()
    ids = [r["doc_id"] for r in rows]
    assert len(ids) == len(set(ids))
    from us_flight_bigdata_dashboard_spark.sources.catalog import load_table

    want = load_table(spark, "/root/testdata/sf0.001", "documents").count()
    assert len(ids) == want
    assert all(r["meta_ok"] for r in rows)
    assert all(r["shard"] == r["doc_id"] % TS.TAR_SHARDS for r in rows)


def test_curation_to_shards_receipt_detects_stage_faults(spark):
    """The capstone receipt must move when any stage moves: baseline at
    sf0.001 equals the independently computed expectation, and the
    filter/dedup stages demonstrably dropped rows."""
    from us_flight_bigdata_dashboard_spark.operators.tar_shards import (
        CURATE_MAX_CHARS,
        CURATE_MIN_CHARS,
        q_curation_to_shards,
    )
    from us_flight_bigdata_dashboard_spark.sources.catalog import load_table

    rows = q_curation_to_shards(spark, "/root/testdata/sf0.001").collect()
    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    n_all = docs.count()
    import pyspark.sql.functions as F

    kept = docs.filter(
        (F.col("n_chars") >= CURATE_MIN_CHARS)
        & (F.col("n_chars") <= CURATE_MAX_CHARS)
    )
    n_kept = kept.count()
    n_dedup = kept.select(F.md5("text")).distinct().count()
    assert n_kept < n_all  # the filter stage really filtered
    total = sum(r["n_docs"] for r in rows)
    assert total == n_dedup  # receipt count == post-dedup count
    assert all(r["digest_sum"] >= 0 for r in rows)
