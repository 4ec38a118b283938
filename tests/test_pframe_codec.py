"""Crafted tests for the SGV1 predicted-frame codec: the compression must
be REAL (P-frames ≪ I-frame; pure-scroll blocks reduce to a bare motion
vector with all-zero residuals and the exact expected shift), and corrupt
payloads must surface as diagnosable ValueErrors, not wrong frames."""

from __future__ import annotations

import struct

import numpy as np
import pandas as pd
import pytest

from us_flight_bigdata_dashboard_spark.operators.pframe_codec import (
    SGV_B,
    SGV_BLOCKS,
    SGV_FRAMES,
    SGV_H,
    SGV_MAGIC,
    SGV_W,
    make_rle,
    make_scene_planes,
    make_sgv_decoder,
    make_sgv_encoder,
)


def _encode(mids: list[int]) -> pd.DataFrame:
    enc = make_sgv_encoder()
    return next(enc(iter([pd.DataFrame({"media_id": mids})])))


def _decode(payloads: pd.DataFrame) -> pd.DataFrame:
    dec = make_sgv_decoder()
    return next(dec(iter([payloads])))


def _parse_frames(b: bytes):
    """Split a payload into (ftype, body) frames."""
    assert b[:4] == SGV_MAGIC
    pos, frames = 8, []
    for _ in range(SGV_FRAMES):
        ftype = b[pos]
        (blen,) = struct.unpack("<H", b[pos + 1 : pos + 3])
        frames.append((ftype, b[pos + 3 : pos + 3 + blen]))
        pos += 3 + blen
    assert pos == len(b)
    return frames


def test_roundtrip_matches_scene_formula():
    out = _encode([1, 7, 12345])
    rows = _decode(out)
    scene = make_scene_planes()
    wgt = 1 + np.arange(SGV_W)[None, :] + SGV_W * np.arange(SGV_H)[:, None]
    for m in (1, 7, 12345):
        planes = scene(m, np)
        sub = rows[rows.media_id == m]
        assert sorted(sub.frame_idx) == list(range(SGV_FRAMES))
        for f in range(SGV_FRAMES):
            p = planes[f].astype(np.int64)
            r = sub[sub.frame_idx == f].iloc[0]
            assert int(r.frame_sum) == int(p.sum())
            assert int(r.pos_sum) == int((p * wgt).sum())


def test_pframes_compress_against_iframe():
    # temporal prediction must pay: every P-frame body materially smaller
    # than the I-frame body (only sprite-crossing and sprite-uncovered
    # blocks carry literals), and the whole stream under raw size
    for m in (3, 42, 999):
        (payload,) = _encode([m]).payload
        frames = _parse_frames(bytes(payload))
        assert frames[0][0] == 0 and all(t == 1 for t, _ in frames[1:])
        i_len = len(frames[0][1])
        for _, body in frames[1:]:
            assert len(body) < 0.7 * i_len, (m, len(body), i_len)
        raw = SGV_FRAMES * SGV_W * SGV_H
        assert len(payload) < 0.75 * raw


def test_scroll_only_block_is_pure_motion_vector():
    # m=16: dx=3, dy=3; sprite at (4, 8) → block 1 (x 8-15, y 0-7) never
    # touches the sprite in the current frame NOR in its (3,3)-shifted
    # source region, so SAD-0 is unique at the true scroll shift: the
    # encoder must emit mv=(3,3) and an all-zero residual for it.
    m = 16
    dx, dy = m % 7 + 1, m % 5 + 2
    assert (dx, dy) == (3, 3)
    (payload,) = _encode([m]).payload
    _, rle_decode = make_rle()
    for ftype, body in _parse_frames(bytes(payload))[1:]:
        assert ftype == 1
        mvs = [(body[2 * i], body[2 * i + 1]) for i in range(SGV_BLOCKS)]
        assert mvs[1] == (dx, dy), mvs
        res, end = rle_decode(body, 2 * SGV_BLOCKS, SGV_BLOCKS * SGV_B * SGV_B, np)
        assert end == len(body)
        block1 = res[SGV_B * SGV_B : 2 * SGV_B * SGV_B]
        assert not block1.any(), "scroll-only block must have zero residual"


def test_corrupt_payloads_raise_value_error():
    (payload,) = _encode([5]).payload
    b = bytearray(payload)
    bad_magic = bytes([0x58]) + bytes(b[1:])
    truncated = bytes(b[: len(b) - 3])
    trailing = bytes(b) + b"\x00"
    for bad in (bad_magic, truncated, trailing):
        with pytest.raises(ValueError):
            _decode(pd.DataFrame({"media_id": [5], "payload": [bad]}))


def test_spark_path_runs_end_to_end(spark):
    from us_flight_bigdata_dashboard_spark.operators.pframe_codec import (
        q_multimodal_pframe_decode,
    )

    rows = (
        q_multimodal_pframe_decode(spark, "/root/testdata/sf0.001")
        .orderBy("media_id", "frame_idx")
        .limit(8)
        .collect()
    )
    assert len(rows) == 8
    scene = make_scene_planes()
    for r in rows:
        p = scene(r["media_id"], np)[r["frame_idx"]].astype(np.int64)
        assert r["frame_sum"] == int(p.sum())
        assert r["n_blocks"] == SGV_BLOCKS
