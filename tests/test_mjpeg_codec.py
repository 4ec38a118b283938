"""Crafted tests for the AVI/MJPEG container codec (operators/mjpeg_codec.py).

The exact gate proves the per-frame closed form end-to-end; these cover the
CONTAINER layer it can't isolate — RIFF structure validity, header/index
cross-checks (avih frame count, idx1 offsets/sizes, stream handler), word
padding with odd-length frames, and corruption detection."""

from __future__ import annotations

import struct

import pandas as pd
import pytest

from us_flight_bigdata_dashboard_spark.operators import jpeg_codec as J
from us_flight_bigdata_dashboard_spark.operators import mjpeg_codec as M


def _encode(ids=(5,)):
    return next(M.make_mjpeg_writer()(iter([pd.DataFrame({"media_id": list(ids)})])))


def _decode(wdf):
    return next(M.make_mjpeg_decoder()(iter([wdf])))


def test_container_structure_is_real_riff_avi():
    b = bytes(_encode().payload[0])
    assert b[:4] == b"RIFF" and b[8:12] == b"AVI "
    (riff_len,) = struct.unpack("<I", b[4:8])
    assert 8 + riff_len == len(b)
    for marker in (b"hdrl", b"avih", b"strl", b"strh", b"strf", b"movi", b"00dc", b"idx1"):
        assert marker in b, marker
    assert b"MJPG" in b and b"vids" in b
    # every frame chunk is a real JPEG (SOI right after the chunk header)
    pos = b.find(b"00dc")
    assert b[pos + 8 : pos + 10] == b"\xff\xd8"


def test_per_frame_sums_match_jpeg_closed_form():
    dec = _decode(_encode(ids=(3, 9)))
    assert len(dec) == 2 * M.MJPEG_FRAMES
    for _, r in dec.iterrows():
        pseudo = r.media_id * M._FRAME_MUL + r.frame_idx
        want = sum(
            64 * J.flat_block_value(J.gate_block_value(pseudo, blk))
            for blk in range(J.JPEG_BLOCKS)
        )
        assert int(r.frame_sum) == want


def test_frames_differ_within_one_video():
    dec = _decode(_encode())
    sums = list(dec.frame_sum)
    assert len(set(sums)) == M.MJPEG_FRAMES  # real per-frame content


def test_byte_determinism():
    a, b = _encode(), _encode()
    assert bytes(a.payload[0]) == bytes(b.payload[0])


def test_truncated_riff_length_rejected():
    b = bytes(_encode().payload[0])
    with pytest.raises(ValueError, match="RIFF length"):
        _decode(pd.DataFrame({"media_id": [5], "payload": [b[:-10]]}))


def test_bad_magic_rejected():
    with pytest.raises(ValueError, match="not a RIFF/AVI"):
        _decode(pd.DataFrame({"media_id": [5], "payload": [b"RIFFxxxxWAVE" + b"\x00" * 20]}))


def test_avih_frame_count_cross_checked():
    b = bytearray(bytes(_encode().payload[0]))
    pos = bytes(b).find(b"avih")
    # dwTotalFrames is at avih body offset 16
    b[pos + 8 + 16] += 1
    with pytest.raises(ValueError, match="frame count"):
        _decode(pd.DataFrame({"media_id": [5], "payload": [bytes(b)]}))


def test_idx1_offset_cross_checked():
    b = bytearray(bytes(_encode().payload[0]))
    pos = bytes(b).find(b"idx1")
    # first entry's offset field (body offset 8 within the entry)
    entry = pos + 8
    b[entry + 8] += 4
    with pytest.raises(ValueError, match="idx1 entry"):
        _decode(pd.DataFrame({"media_id": [5], "payload": [bytes(b)]}))


def test_wrong_stream_handler_rejected():
    b = bytearray(bytes(_encode().payload[0]))
    pos = bytes(b).find(b"strh")
    assert b[pos + 8 + 4 : pos + 8 + 8] == b"MJPG"
    b[pos + 8 + 4 : pos + 8 + 8] = b"H264"
    with pytest.raises(ValueError, match="handler"):
        _decode(pd.DataFrame({"media_id": [5], "payload": [bytes(b)]}))


def test_corrupt_frame_bytes_fail_jpeg_layer():
    b = bytearray(bytes(_encode().payload[0]))
    pos = bytes(b).find(b"00dc")
    b[pos + 8] = 0x00  # break the frame's SOI
    with pytest.raises(ValueError, match="SOI"):
        _decode(pd.DataFrame({"media_id": [5], "payload": [bytes(b)]}))


def test_spark_end_to_end(spark):
    rows = M.q_multimodal_mjpeg_decode(spark, "/root/testdata/sf0.001").collect()
    assert len(rows) > 0 and len(rows) % M.MJPEG_FRAMES == 0
    for r in rows[:12]:
        pseudo = r["media_id"] * M._FRAME_MUL + r["frame_idx"]
        want = sum(
            64 * J.flat_block_value(J.gate_block_value(pseudo, blk))
            for blk in range(J.JPEG_BLOCKS)
        )
        assert r["frame_sum"] == want
