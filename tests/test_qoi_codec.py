"""QOI codec ground truth: a pure-Python reference decode of the gate
stream, op-kind coverage of the gate image (all six ops must be LIVE in
the driver gate, per the module's claim), wraparound/int8 edge images,
and malformed-stream rejection — mirroring test_bmp_codec.py's model."""

from __future__ import annotations

import struct

import pandas as pd
import pytest

from us_flight_bigdata_dashboard_spark.operators.qoi_codec import (
    QOI_H,
    QOI_W,
    make_qoi_decoder,
    make_qoi_writer,
    qoi_pixels,
)


def _encode(mid: int, pixel_fn=None) -> bytes:
    writer = make_qoi_writer(pixel_fn)
    (out,) = writer(iter([pd.DataFrame({"media_id": [mid]})]))
    return bytes(out["payload"][0])


def _decode(payload: bytes):
    decoder = make_qoi_decoder()
    (out,) = decoder(
        iter([pd.DataFrame({"media_id": [0], "payload": [payload]})])
    )
    return out.iloc[0]


def _op_kinds(payload: bytes) -> set:
    """Walk the op stream, return the set of op kinds used."""
    body = payload[14:-8]
    kinds = set()
    i = 0
    n = 0
    while i < len(body) and n < QOI_W * QOI_H:
        b1 = body[i]
        i += 1
        if b1 == 0xFE:
            kinds.add("rgb")
            i += 3
            n += 1
        elif b1 == 0xFF:
            kinds.add("rgba")
            i += 4
            n += 1
        else:
            tag = b1 >> 6
            if tag == 0b00:
                kinds.add("index")
                n += 1
            elif tag == 0b01:
                kinds.add("diff")
                n += 1
            elif tag == 0b10:
                kinds.add("luma")
                i += 1
                n += 1
            else:
                kinds.add("run")
                n += (b1 & 0x3F) + 1
    return kinds


def test_roundtrip_matches_generator():
    for mid in (0, 1, 7, 123, 99991):
        payload = _encode(mid)
        row = _decode(payload)
        px = qoi_pixels(mid)
        lums = [299 * r + 587 * g + 114 * b for r, g, b in px]
        assert row["width"] == QOI_W and row["height"] == QOI_H
        assert row["n_pixels"] == QOI_W * QOI_H
        assert row["sum_lum"] == sum(lums)
        assert row["sum_sq"] == sum(v * v for v in lums)


def test_gate_image_uses_all_op_kinds():
    kinds = set()
    for mid in (0, 1, 7, 123):
        kinds |= _op_kinds(_encode(mid))
    assert {"run", "index", "diff", "luma", "rgb"} <= kinds


def test_wraparound_diff():
    # 255 -> 0 is dr = +1 (wraparound): must round-trip through DIFF
    def pxf(_mid):
        out = [(255, 255, 255)] + [(0, 0, 0)] + [(254, 254, 254)]
        out += [(10, 20, 30)] * (QOI_W * QOI_H - len(out))
        return out

    payload = _encode(0, pxf)
    row = _decode(payload)
    px = pxf(0)
    lums = [299 * r + 587 * g + 114 * b for r, g, b in px]
    assert row["sum_lum"] == sum(lums)
    assert row["sum_sq"] == sum(v * v for v in lums)


def test_long_run_splits_at_62():
    def pxf(_mid):
        return [(5, 6, 7)] * (QOI_W * QOI_H)

    payload = _encode(0, pxf)
    body = payload[14:-8]
    # first pixel is a LUMA op ((5,6,7) vs the implicit (0,0,0,255) fits
    # the green-anchored deltas), then runs of <= 62
    assert body[0] >> 6 == 0b10
    i = 2
    total = 1
    while i < len(body):
        assert body[i] >> 6 == 0b11
        run = (body[i] & 0x3F) + 1
        assert run <= 62
        total += run
        i += 1
    assert total == QOI_W * QOI_H
    row = _decode(payload)
    assert row["n_pixels"] == QOI_W * QOI_H


@pytest.mark.parametrize(
    "mutate, msg",
    [
        (lambda b: b"nope" + b[4:], "not a QOI stream"),
        (lambda b: b[:-1] + b"\x02", "missing end marker"),
        (lambda b: b[:12] + b"\x07" + b[13:], "bad channel count"),
        (lambda b: b[:14] + b[14:-8][:-1] + b[-8:], "truncated|trailing|pixel"),
    ],
)
def test_malformed_rejected(mutate, msg):
    import re

    payload = _encode(3)
    with pytest.raises(ValueError, match=msg):
        _decode(mutate(payload))


def test_header_fields_big_endian():
    payload = _encode(0)
    w, h, ch, cs = struct.unpack(">IIBB", payload[4:14])
    assert (w, h, ch, cs) == (QOI_W, QOI_H, 3, 0)


# ---------------------------------------------------------------------------
# hypothesis property suites (the codec fuzz discipline of
# test_bmp_codec.py applied to the stateful op-stream code)
# ---------------------------------------------------------------------------

from hypothesis import given, settings
from hypothesis import strategies as st

_NPX = QOI_W * QOI_H

_SEGMENT = st.tuples(
    st.sampled_from(["run", "step1", "step3", "jump", "revisit"]),
    st.integers(0, 255),  # seed value
    st.integers(1, 300),  # length
)


@settings(max_examples=40, deadline=None)
@given(segs=st.lists(_SEGMENT, min_size=1, max_size=20))
def test_fuzz_random_segments_roundtrip(segs):
    """Random pixel segments exercising every op class (runs, ±1 DIFF
    gradients, LUMA-range gradients, hard RGB jumps, palette revisits
    that hit the 64-slot index) must round-trip exactly through the real
    encoder+decoder pair."""
    px = []
    k = 0
    pal = [(7, 11, 13), (200, 90, 30), (55, 55, 55), (0, 0, 0)]
    while len(px) < _NPX:
        kind, v, n = segs[k % len(segs)]
        if kind == "run":
            px += [((v * 3) % 256, (v * 5) % 256, (v * 7) % 256)] * n
        elif kind == "step1":
            px += [((v + j) % 256, (v + j) % 256, (v + j) % 256) for j in range(min(n, 40))]
        elif kind == "step3":
            px += [
                ((v + 3 * j) % 256, (v + 2 * j) % 256, (v + 4 * j) % 256)
                for j in range(min(n, 40))
            ]
        elif kind == "jump":
            px += [((v * 97 + 131 * j) % 256, (v * 53 + 17 * j) % 256, (v * 29 + 211 * j) % 256) for j in range(min(n, 12))]
        else:  # revisit: index-op fuel
            px += [pal[(v + j) % len(pal)] for j in range(min(n, 16))]
        k += 1
    px = px[:_NPX]
    payload = _encode(0, lambda mid: px)
    row = _decode(payload)
    lums = [299 * r + 587 * g + 114 * b for r, g, b in px]
    assert row["n_pixels"] == _NPX
    assert row["sum_lum"] == sum(lums)
    assert row["sum_sq"] == sum(v * v for v in lums)


@settings(max_examples=120, deadline=None)
@given(
    pos=st.integers(min_value=0, max_value=4000),
    val=st.integers(min_value=0, max_value=255),
)
def test_fuzz_single_byte_corruption_never_crashes_uncontrolled(pos, val):
    """Flip any single byte anywhere in the stream: the decoder must
    either still decode (the byte was semantically slack) or raise a
    diagnosable ValueError — never an uncontrolled internal error. A
    stateful op-stream makes this harsher than BMP's RLE: one flipped
    tag desynchronizes every subsequent op."""
    payload = bytearray(_encode(5))
    pos = pos % len(payload)
    if payload[pos] == val:
        return
    payload[pos] = val
    try:
        _decode(bytes(payload))
    except ValueError:
        pass
