"""Crafted tests for the baseline JPEG codec (operators/jpeg_codec.py).

The exact gate covers flat-block images (where the lossy pipeline has a
closed form); these tests cover what the gate cannot: the closed-form
identity itself over EVERY block value (so the oracle is independent
arithmetic, not shared code), non-flat content through the real AC
Huffman path, signed DC diffs, non-square dimensions, determinism, and
corruption detection."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from us_flight_bigdata_dashboard_spark.operators import jpeg_codec as J


def _encode(pixel_fn, w=32, h=32, ids=(5,)):
    writer = J.make_jpeg_writer(w, h, pixel_fn=pixel_fn)
    return next(writer(iter([pd.DataFrame({"media_id": list(ids)})])))


def _decode(wdf):
    return next(J.make_jpeg_decoder()(iter([wdf])))


def test_flat_block_closed_form_for_every_value():
    """The oracle's closed form must equal the FULL codec (general integer
    FDCT → quantize → Huffman bytes → parse → dequantize → general integer
    IDCT) for every possible flat-block value 0..255 — including values
    below 128, which drive NEGATIVE DC coefficients through the sign-aware
    quantizer and the Huffman EXTEND path."""
    for lo in range(0, 256, 64):
        vals = list(range(lo, lo + 64))

        def pix(mid, _vals=vals):
            px = np.zeros((16, 256), dtype=np.uint8)
            for b, v in enumerate(_vals):
                r, c = divmod(b, 32)
                px[r * 8 : r * 8 + 8, c * 8 : c * 8 + 8] = v
            return px

        wdf = _encode(pix, w=256, h=16, ids=(0,))
        ddf = _decode(wdf)
        expected = sum(64 * J.flat_block_value(v) for v in vals)
        assert int(ddf.sum_lum[0]) == expected, f"range {lo}..{lo+63}"


def test_nonflat_roundtrip_close_and_deterministic():
    def noise(mid):
        idx = np.arange(32 * 32)
        return (((mid * 31 + idx) * 2654435761) % 256).astype(np.uint8).reshape(32, 32)

    wdf1, wdf2 = _encode(noise), _encode(noise)
    # byte determinism: same input → identical JPEG bytes
    assert bytes(wdf1.payload[0]) == bytes(wdf2.payload[0])
    d1, d2 = _decode(wdf1), _decode(wdf2)
    assert int(d1.sum_lum[0]) == int(d2.sum_lum[0])
    orig = noise(5).astype(np.int64).sum()
    # lossy but close: JPEG at Annex-K quantization keeps sums within ~1%
    assert abs(int(d1.sum_lum[0]) - orig) / orig < 0.01


def test_nonsquare_dimensions_not_swapped():
    """SOF0 stores height then width; a swapped pack/parse pair only shows
    on non-square images."""

    def grad(mid):
        return (np.add.outer(np.arange(24) * 3, np.arange(40) * 2) % 256).astype(
            np.uint8
        )

    ddf = _decode(_encode(grad, w=40, h=24))
    assert int(ddf.width[0]) == 40 and int(ddf.height[0]) == 24
    assert int(ddf.n_blocks[0]) == 5 * 3


def test_jpeg_bytes_are_real_jfif():
    wdf = _encode(None)  # default gate formula
    b = bytes(wdf.payload[0])
    assert b[:2] == b"\xff\xd8" and b[-2:] == b"\xff\xd9"
    assert b[2:4] == b"\xff\xe0" and b[6:11] == b"JFIF\x00"
    # marker census: one DQT, one SOF0, two DHT, one SOS
    for marker, n in [(b"\xff\xdb", 1), (b"\xff\xc0", 1), (b"\xff\xc4", 2), (b"\xff\xda", 1)]:
        assert b.count(marker) == n, marker


def test_corrupted_header_rejected():
    wdf = _encode(None)
    b = bytearray(bytes(wdf.payload[0]))
    b[0] = 0x00  # break SOI
    wdf2 = pd.DataFrame({"media_id": [5], "payload": [bytes(b)]})
    with pytest.raises(ValueError, match="SOI"):
        _decode(wdf2)


def test_progressive_sof_rejected():
    wdf = _encode(None)
    b = bytearray(bytes(wdf.payload[0]))
    i = bytes(b).find(b"\xff\xc0")
    b[i + 1] = 0xC2  # SOF0 → SOF2 (progressive)
    with pytest.raises(ValueError, match="non-baseline"):
        _decode(pd.DataFrame({"media_id": [5], "payload": [bytes(b)]}))


def test_decoder_uses_file_tables_not_module_constants():
    """The decoder must honor the DQT carried in the FILE: doubling the
    stored quant table changes the decoded pixels accordingly (a decoder
    that dequantized with this module's QTABLE constant would not)."""
    wdf = _encode(None, ids=(3,))
    b = bytearray(bytes(wdf.payload[0]))
    i = bytes(b).find(b"\xff\xdb")
    # DQT payload: 2-byte length, 1-byte Pq/Tq, then 64 zigzagged bytes;
    # entry 0 of the zigzag IS q00 — halve it (16 → 8): the dequantized DC
    # halves, so every flat block's reconstruction shifts toward gray
    assert b[i + 5] == J.QTABLE[0]
    b[i + 5] = J.QTABLE[0] // 2
    tampered = _decode(pd.DataFrame({"media_id": [3], "payload": [bytes(b)]}))
    original = _decode(wdf)
    assert int(tampered.sum_lum[0]) != int(original.sum_lum[0])


def test_gate_entry_matches_oracle_formula_spark(spark):
    """End-to-end under Spark mapInPandas at sf0.001: the full two-stage
    pipeline agrees with the closed-form python replica per media_id."""
    from us_flight_bigdata_dashboard_spark.operators.jpeg_codec import (
        q_multimodal_jpeg_decode,
    )

    rows = q_multimodal_jpeg_decode(spark, "/root/testdata/sf0.001").collect()
    assert len(rows) > 0
    for r in rows[:25]:
        expected = sum(
            64 * J.flat_block_value(J.gate_block_value(r["media_id"], b))
            for b in range(J.JPEG_BLOCKS)
        )
        assert r["sum_lum"] == expected
        assert (r["width"], r["height"], r["n_blocks"]) == (32, 32, 16)


def test_truncated_scan_dangling_ff_is_valueerror():
    """A scan cut immediately after a bare 0xFF must raise the diagnostic
    ValueError, not a TypeError from formatting None (ADVICE r5)."""
    wdf = _encode(None)
    b = bytes(wdf.payload[0])
    assert b[-2:] == b"\xff\xd9"
    cut = b[:-1]  # drop the D9: scan now ends on a dangling 0xFF
    with pytest.raises(ValueError, match="dangling 0xFF"):
        _decode(pd.DataFrame({"media_id": [5], "payload": [cut]}))


def test_truncated_entropy_data_is_valueerror():
    """Entropy data exhausted mid-block must surface as ValueError, not an
    IndexError leaking out of BitReader (ADVICE r5)."""
    wdf = _encode(None)
    b = bytes(wdf.payload[0])
    i = b.find(b"\xff\xda")
    seglen = int.from_bytes(b[i + 2 : i + 4], "big")
    scan_start = i + 2 + seglen
    cut = b[: scan_start + 2] + b"\xff\xd9"  # 2 bytes of entropy data only
    with pytest.raises(ValueError, match="truncated entropy|invalid Huffman"):
        _decode(pd.DataFrame({"media_id": [5], "payload": [cut]}))
