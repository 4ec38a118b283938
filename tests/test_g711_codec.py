"""Crafted tests for the G.711 μ-law WAV codec (operators/g711_codec.py).

The exact gate proves the closed form end-to-end; these pin the codec
against the spec directly — exhaustive int16 companding properties,
monotonicity, quantization-error bounds per segment, the non-PCM
container contract (format tag, fact chunk), and corruption detection."""

from __future__ import annotations

import struct

import pandas as pd
import pytest

from us_flight_bigdata_dashboard_spark.operators import g711_codec as G


def _encode(pcm_fn=None, ids=(5,)):
    return next(
        G.make_g711_writer(pcm_fn)(iter([pd.DataFrame({"media_id": list(ids)})]))
    )


def _decode(wdf):
    return next(G.make_g711_decoder()(iter([wdf])))


def test_companding_roundtrip_error_bounded_by_segment():
    """|decode(encode(x)) − x| < 2^exp·8 + bias slack for every int16 —
    the defining property of 8-segment μ-law."""
    for x in range(-32768, 32768, 7):
        y = G.ulaw_decode(G.ulaw_encode(x))
        xa = min(abs(x), G._CLIP)
        v = xa + G._BIAS
        exp = max(v.bit_length() - 8, 0)
        step = 8 << exp
        assert abs(y - (x if abs(x) <= G._CLIP else (G._CLIP if x > 0 else -G._CLIP))) <= step, x


def test_companding_monotone_nonnegative_domain():
    prev = None
    for x in range(0, 32768, 3):
        y = G.ulaw_decode(G.ulaw_encode(x))
        if prev is not None:
            assert y >= prev, x
        prev = y


def test_encode_byte_is_complemented():
    """μ-law transmits the complement (all-1s near silence): x=0 must give
    0xFF, the spec's famous idle-channel byte."""
    assert G.ulaw_encode(0) == 0xFF


def test_decode_is_exact_inverse_on_codebook():
    """Every code byte decodes to a value that re-encodes to itself —
    except 0x7F, μ-law's NEGATIVE zero: both 0x7F and 0xFF decode to 0,
    and the encoder canonicalizes 0 to the positive-zero byte 0xFF (the
    spec's known ±0 aliasing)."""
    for u in range(256):
        if u == 0x7F:
            assert G.ulaw_decode(u) == 0
            assert G.ulaw_encode(G.ulaw_decode(u)) == 0xFF
            continue
        assert G.ulaw_encode(G.ulaw_decode(u)) == u


def test_container_is_nonpcm_wav_with_fact():
    b = bytes(_encode().payload[0])
    assert b[:4] == b"RIFF" and b[8:12] == b"WAVE"
    i = b.find(b"fmt ")
    tag, n_ch, rate, _br, _ba, bits = struct.unpack("<HHIIHH", b[i + 8 : i + 24])
    assert (tag, n_ch, rate, bits) == (7, 1, G.G711_RATE, 8)
    assert b.find(b"fact") > 0


def test_fact_chunk_cross_checked():
    b = bytearray(bytes(_encode().payload[0]))
    i = bytes(b).find(b"fact")
    b[i + 8] ^= 0x01
    with pytest.raises(ValueError, match="fact"):
        _decode(pd.DataFrame({"media_id": [5], "payload": [bytes(b)]}))


def test_pcm_format_tag_rejected():
    b = bytearray(bytes(_encode().payload[0]))
    i = bytes(b).find(b"fmt ")
    b[i + 8] = 1  # wFormatTag 7 → 1 (PCM)
    with pytest.raises(ValueError, match="wFormatTag"):
        _decode(pd.DataFrame({"media_id": [5], "payload": [bytes(b)]}))


def test_gate_signal_exercises_every_segment_and_clip():
    """The generating formula must hit all 8 segments, both signs, and the
    clip region — otherwise the gate under-tests the codec."""
    segs, signs, clipped = set(), set(), 0
    for mid in range(20):
        for x in G._pcm_samples(mid):
            v = min(abs(x), G._CLIP) + G._BIAS
            segs.add(max(v.bit_length() - 8, 0))
            signs.add(x < 0)
            clipped += abs(x) > G._CLIP
    assert segs == set(range(8)) and signs == {True, False} and clipped > 0


def test_spark_end_to_end_matches_reference(spark):
    rows = G.q_multimodal_g711_decode(spark, "/root/testdata/sf0.001").collect()
    assert len(rows) > 0
    for r in rows[:25]:
        xs = [G.ulaw_decode(G.ulaw_encode(x)) for x in G._pcm_samples(r["media_id"])]
        assert r["sum_decoded"] == sum(xs)
        assert r["sum_sq_decoded"] == sum(v * v for v in xs)
