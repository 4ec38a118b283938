"""Hypothesis property tests for the codec family: lossless codecs must
round-trip ARBITRARY inputs bit-for-bit (not just the gate formulas), and
the lossy-but-closed-form ones must match their reference arithmetic on
any input. Each failure case hypothesis finds shrinks to a minimal
reproducer — the cheapest adversarial coverage the crafted tests can't
enumerate."""

from __future__ import annotations

import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from us_flight_bigdata_dashboard_spark.operators import flac_codec as FL
from us_flight_bigdata_dashboard_spark.operators import g711_codec as G711
from us_flight_bigdata_dashboard_spark.operators import gif_codec as GIF
from us_flight_bigdata_dashboard_spark.operators import tar_shards as TAR
from us_flight_bigdata_dashboard_spark.operators import zip_archive as ZIP

_SETTINGS = dict(max_examples=25, deadline=None)


@settings(**_SETTINGS)
@given(
    st.lists(
        st.integers(min_value=-32768, max_value=32767),
        min_size=FL.FLAC_SAMPLES,
        max_size=FL.FLAC_SAMPLES,
    )
)
def test_flac_lossless_on_arbitrary_pcm(pcm):
    enc = next(
        FL.make_flac_writer(lambda mid: pcm)(
            iter([pd.DataFrame({"media_id": [1]})])
        )
    )
    dec = next(FL.make_flac_decoder()(iter([enc])))
    assert int(dec.sum_amp[0]) == sum(pcm)
    assert int(dec.sum_sq[0]) == sum(x * x for x in pcm)
    assert bool(dec.md5_ok[0])


@settings(**_SETTINGS)
@given(
    st.lists(st.integers(min_value=0, max_value=255), min_size=1, max_size=256)
)
def test_gif_lzw_lossless_on_arbitrary_pixels(pattern):
    """Tile an arbitrary small pattern to the full image — keeps
    hypothesis shrinking effective while the codec still sees every byte
    value, run structure, and dictionary shape the pattern induces."""
    n = GIF.GIF_W * GIF.GIF_H
    px = (pattern * (n // len(pattern) + 1))[:n]
    enc = next(
        GIF.make_gif_writer(lambda mid: px)(
            iter([pd.DataFrame({"media_id": [1]})])
        )
    )
    dec = next(GIF.make_gif_decoder()(iter([enc])))
    assert int(dec.sum_lum[0]) == sum(1000 * v for v in px)


@settings(**_SETTINGS)
@given(st.integers(min_value=-32768, max_value=32767))
def test_g711_closed_form_matches_reference(x):
    v = min(abs(x), G711._CLIP) + G711._BIAS
    exp = max(v.bit_length() - 8, 0)
    p3 = 8 << exp
    dx = (((v // p3) % 16) * 8 + G711._BIAS) * (p3 // 8) - G711._BIAS
    want = -dx if x < 0 else dx
    assert G711.ulaw_decode(G711.ulaw_encode(x)) == want


_texts = st.lists(
    st.text(
        alphabet=st.characters(blacklist_categories=("Cs",)), max_size=600
    ),
    min_size=1,
    max_size=6,
)


@settings(**_SETTINGS)
@given(_texts)
def test_tar_shard_roundtrips_arbitrary_unicode(texts):
    rows = [
        (i * 3, 1, t, "xx", "prop") for i, t in enumerate(texts)
    ]
    pdf = pd.DataFrame(rows, columns=["doc_id", "shard", "text", "lang", "source"])
    packed = TAR.make_tar_packer()(pdf)
    dec = next(TAR.make_tar_reader()(iter([packed])))
    got = dict(zip(dec.doc_id, dec.n_chars))
    for i, t in enumerate(texts):
        assert got[i * 3] == len(t)
    assert all(dec.meta_ok)


@settings(**_SETTINGS)
@given(_texts)
def test_zip_roundtrips_arbitrary_unicode(texts):
    rows = [(i * 5, 2, t) for i, t in enumerate(texts)]
    pdf = pd.DataFrame(rows, columns=["doc_id", "bundle", "text"])
    packed = ZIP.make_zip_packer()(pdf)
    dec = next(ZIP.make_zip_reader()(iter([packed])))
    got = dict(zip(dec.doc_id, dec.n_chars))
    for i, t in enumerate(texts):
        assert got[i * 5] == len(t)
    assert all(dec.crc_ok)


@settings(**_SETTINGS)
@given(
    st.lists(
        st.integers(min_value=-32768, max_value=32767),
        min_size=64,
        max_size=64,
    )
)
def test_adpcm_decoder_tracks_encoder_reconstruction(pcm):
    """ADPCM is lossy, but the container decoder's output must equal the
    closed-loop encoder's internal reconstruction on ANY input — the
    invariant the recursive-CTE oracle states. Verified here end-to-end
    through real WAV bytes, including both predictor and index clamps."""
    from us_flight_bigdata_dashboard_spark.operators import adpcm_codec as AD

    enc = next(
        AD.make_adpcm_writer(lambda mid: pcm)(
            iter([pd.DataFrame({"media_id": [1]})])
        )
    )
    dec = next(AD.make_adpcm_decoder()(iter([enc])))
    pred, idx = pcm[0], 0
    recon = [pred]
    for x in pcm[1:]:
        _nib, pred, idx = AD._step_encode(x, pred, idx)
        recon.append(pred)
    assert int(dec.n_samples[0]) == 64
    assert int(dec.sum_decoded[0]) == sum(recon)
    assert int(dec.sum_sq_decoded[0]) == sum(v * v for v in recon)
