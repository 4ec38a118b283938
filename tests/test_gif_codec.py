"""Crafted tests for the baseline GIF/LZW codec (operators/gif_codec.py).

The exact gate proves decode(encode(gate formula)) == formula; these cover
the LZW corner cases the gate image may not isolate — the KwKwK code, the
code-width growth boundary, 255-byte sub-block fragmentation, palette
honesty (luminance must go THROUGH the color table), and corruption
detection (bad magic, truncation, pixel-count mismatch, missing trailer)."""

from __future__ import annotations

import pandas as pd
import pytest

from us_flight_bigdata_dashboard_spark.operators import gif_codec as G

NPX = G.GIF_W * G.GIF_H


def _roundtrip(pixel_fn=None, palette=None, ids=(5,)):
    enc = next(
        G.make_gif_writer(pixel_fn, palette)(
            iter([pd.DataFrame({"media_id": list(ids)})])
        )
    )
    dec = next(G.make_gif_decoder()(iter([enc])))
    return enc, dec


SIGNALS = {
    "gate": None,
    "constant": lambda mid: [7] * NPX,  # immediate KwKwK (aaaa...)
    "two_tone": lambda mid: [0, 255] * (NPX // 2),
    "noise": lambda mid: [((mid * 31 + i) * 2654435761) % 256 for i in range(NPX)],
    "ramp": lambda mid: [i % 256 for i in range(NPX)],
}


@pytest.mark.parametrize("name", sorted(SIGNALS))
def test_lossless_roundtrip_every_signal_family(name):
    fn = SIGNALS[name]
    enc, dec = _roundtrip(fn)
    px = fn(5) if fn else G._pixels(5)
    assert int(dec.n_pixels[0]) == NPX
    assert int(dec.sum_lum[0]) == sum(1000 * v for v in px), name
    assert int(dec.sum_sq[0]) == sum((1000 * v) * (1000 * v) for v in px), name


def test_gate_image_crosses_both_width_boundaries():
    """The gate image's LZW table must actually reach past 1024 entries, so
    the 9→10 and 10→11 bit transitions are exercised by the driver gate
    itself, not only by this test file."""
    px = bytes(G._pixels(5))
    table = {bytes([i]): i for i in range(256)}
    next_code, w = 258, b""
    for ch in px:
        c = bytes([ch])
        wc = w + c
        if wc in table:
            w = wc
            continue
        table[wc] = next_code
        next_code += 1
        w = c
    assert next_code > 1024, next_code


def test_compression_is_real():
    enc, _ = _roundtrip()  # gate image: runs of GIF_RUN equal pixels
    # payload = 13 hdr + 768 palette + ~13 descriptors + LZW data; the LZW
    # data must be well under the raw index stream
    lzw_bytes = len(bytes(enc.payload[0])) - 13 - 768 - 13
    assert lzw_bytes < 0.75 * NPX, lzw_bytes


def test_multi_subblock_reassembly():
    """Noise forces > 255 bytes of LZW data → multiple sub-blocks; the
    decoder must reassemble across block boundaries."""
    enc, dec = _roundtrip(SIGNALS["noise"])
    b = bytes(enc.payload[0])
    # count sub-blocks: walk from after LZW-min-code-size byte
    pos = 13 + 768 + 10 + 1
    blocks = 0
    while b[pos] != 0:
        blocks += 1
        pos += 1 + b[pos]
    assert blocks >= 4
    px = SIGNALS["noise"](5)
    assert int(dec.sum_lum[0]) == sum(1000 * v for v in px)


def test_luminance_goes_through_palette():
    """Identity pixels + a permuted palette: a decoder that shortcuts
    index→gray (ignoring the color table) returns the identity sums and
    fails here."""
    perm = [(255 - i, 255 - i, 255 - i) for i in range(256)]
    fn = lambda mid: [i % 256 for i in range(NPX)]  # noqa: E731
    _, dec = _roundtrip(fn, palette=perm)
    px = fn(5)
    assert int(dec.sum_lum[0]) == sum(1000 * (255 - v) for v in px)


def test_color_palette_weights_are_itu_integers():
    """Non-gray palette: luminance = 299r + 587g + 114b exactly."""
    pal = [(i, (i * 3) % 256, (i * 7) % 256) for i in range(256)]
    fn = lambda mid: [i % 256 for i in range(NPX)]  # noqa: E731
    _, dec = _roundtrip(fn, palette=pal)
    lum = lambda i: 299 * i + 587 * ((i * 3) % 256) + 114 * ((i * 7) % 256)  # noqa: E731
    assert int(dec.sum_lum[0]) == sum(lum(v % 256) for v in range(NPX))


def test_byte_determinism():
    enc1, _ = _roundtrip()
    enc2, _ = _roundtrip()
    assert bytes(enc1.payload[0]) == bytes(enc2.payload[0])


def test_bad_magic_rejected():
    with pytest.raises(ValueError, match="not a GIF"):
        next(
            G.make_gif_decoder()(
                iter([pd.DataFrame({"media_id": [0], "payload": [b"PNG....."]})])
            )
        )


def test_truncated_stream_rejected():
    enc, _ = _roundtrip()
    b = bytes(enc.payload[0])[:900]
    with pytest.raises((ValueError, IndexError)):
        next(
            G.make_gif_decoder()(
                iter([pd.DataFrame({"media_id": [5], "payload": [b]})])
            )
        )


def test_pixel_count_mismatch_rejected():
    """Corrupt the image descriptor height: LZW output no longer matches
    the declared pixel count."""
    enc, _ = _roundtrip()
    b = bytearray(bytes(enc.payload[0]))
    pos = 13 + 768  # image descriptor
    assert b[pos] == 0x2C
    b[pos + 7] = b[pos + 7] + 1  # height LE low byte
    with pytest.raises(ValueError, match="!= expected|exceeds image"):
        next(
            G.make_gif_decoder()(
                iter([pd.DataFrame({"media_id": [5], "payload": [bytes(b)]})])
            )
        )


def test_spark_end_to_end_matches_formula(spark):
    rows = G.q_multimodal_gif_decode(spark, "/root/testdata/sf0.001").collect()
    assert len(rows) > 0
    for r in rows[:25]:
        px = G._pixels(r["media_id"])
        assert r["sum_lum"] == sum(1000 * v for v in px)
        assert (r["width"], r["height"], r["n_pixels"]) == (G.GIF_W, G.GIF_H, NPX)
