"""Crafted tests for the ZIP container (operators/zip_archive.py):
stdlib zipfile interop both directions, mixed STORED/DEFLATE method
choice, CRC/central-local cross-checks, and corruption detection."""

from __future__ import annotations

import io
import struct
import zipfile

import pandas as pd
import pytest

from us_flight_bigdata_dashboard_spark.operators import zip_archive as Z


def _pack(rows):
    pdf = pd.DataFrame(rows, columns=["doc_id", "bundle", "text"])
    return Z.make_zip_packer()(pdf)


def _read(packed):
    return next(Z.make_zip_reader()(iter([packed])))


_ROWS = [
    (2, 2, "compress me " * 50),  # compressible → DEFLATE
    (6, 2, "short"),  # deflate would grow → STORED
    (10, 2, "ünïcode tëxt"),
]


def test_stdlib_zipfile_accepts_and_crc_passes():
    payload = bytes(_pack(_ROWS).payload[0])
    zf = zipfile.ZipFile(io.BytesIO(payload))
    assert zf.testzip() is None
    methods = {i.filename: i.compress_type for i in zf.infolist()}
    assert methods["000000002.txt"] == zipfile.ZIP_DEFLATED
    assert methods["000000006.txt"] == zipfile.ZIP_STORED
    assert zf.read("000000010.txt").decode() == "ünïcode tëxt"


def test_our_reader_reads_stdlib_archives():
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as out:
        out.writestr("000000042.txt", "hello from zipfile")
        out.writestr("000000043.txt", "x")
    dec = _read(
        pd.DataFrame({"bundle": [1], "payload": [buf.getvalue()], "n_members": [2]})
    )
    assert sorted(dec.doc_id) == [42, 43] and all(dec.crc_ok)


def test_corrupt_member_byte_flips_crc():
    packed = _pack(_ROWS)
    b = bytearray(bytes(packed.payload[0]))
    # flip a byte inside the first member's data (stored member 6 starts
    # after member 2; corrupt near the middle of the archive body)
    zf = zipfile.ZipFile(io.BytesIO(bytes(b)))
    info = zf.getinfo("000000006.txt")
    data_at = info.header_offset + 30 + len(info.filename)
    b[data_at] ^= 0xFF
    dec = _read(pd.DataFrame({"bundle": [2], "payload": [bytes(b)], "n_members": [3]}))
    by_id = {int(r.doc_id): r for _, r in dec.iterrows()}
    assert not by_id[6].crc_ok
    assert by_id[2].crc_ok and by_id[10].crc_ok


def test_missing_eocd_rejected():
    payload = bytes(_pack(_ROWS).payload[0])[:-22]
    with pytest.raises(ValueError, match="end-of-central-directory"):
        _read(pd.DataFrame({"bundle": [2], "payload": [payload], "n_members": [3]}))


def test_central_local_disagreement_rejected():
    packed = _pack(_ROWS)
    b = bytearray(bytes(packed.payload[0]))
    # tamper the LOCAL header's method field of the first member (offset 8)
    b[8] ^= 0x08
    with pytest.raises(ValueError, match="disagreement"):
        _read(pd.DataFrame({"bundle": [2], "payload": [bytes(b)], "n_members": [3]}))


def test_eocd_count_cross_checked():
    packed = _pack(_ROWS)
    b = bytearray(bytes(packed.payload[0]))
    k = bytes(b).rfind(b"PK\x05\x06")
    n_total = struct.unpack("<H", b[k + 10 : k + 12])[0]
    struct.pack_into("<H", b, k + 10, n_total + 1)
    with pytest.raises(ValueError):
        _read(pd.DataFrame({"bundle": [2], "payload": [bytes(b)], "n_members": [3]}))


def test_spark_end_to_end_all_docs_once(spark):
    rows = Z.q_zip_archive_roundtrip(spark, "/root/testdata/sf0.001").collect()
    ids = [r["doc_id"] for r in rows]
    assert len(ids) == len(set(ids)) and len(ids) > 0
    assert all(r["crc_ok"] for r in rows)
    assert all(r["bundle"] == r["doc_id"] % Z.ZIP_BUNDLES for r in rows)
