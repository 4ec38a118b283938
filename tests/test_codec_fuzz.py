"""Corruption-fuzz the codec/container decoders: a single flipped bit in
any payload must yield either a successful decode (the flip landed
somewhere both self-checks and semantics tolerate) or a diagnosable
``ValueError`` — never an internal IndexError/KeyError/TypeError/
struct.error/zlib.error escaping the worker. This is the decode error
boundary a production ingest needs: corrupt records route to quarantine
by catching ONE exception type, with a message naming the format.

Deterministic seed; the first survey of this property found leaks in
five of the seven decoders (fixed in the same commit that added this
file)."""

from __future__ import annotations

import random

import pandas as pd
import pytest

from us_flight_bigdata_dashboard_spark.operators import (
    adpcm_codec as AD,
    flac_codec as FL,
    g711_codec as G7,
    gif_codec as GIF,
    jpeg_codec as J,
    mjpeg_codec as MJ,
    tar_shards as TAR,
    zip_archive as ZIP,
)


def _one(df):
    return bytes(df.payload[0])


_PAYLOADS = {
    "adpcm": lambda: _one(next(AD.make_adpcm_writer()(iter([pd.DataFrame({"media_id": [5]})])))),
    "flac": lambda: _one(next(FL.make_flac_writer()(iter([pd.DataFrame({"media_id": [5]})])))),
    "gif": lambda: _one(next(GIF.make_gif_writer()(iter([pd.DataFrame({"media_id": [5]})])))),
    "g711": lambda: _one(next(G7.make_g711_writer()(iter([pd.DataFrame({"media_id": [5]})])))),
    "jpeg": lambda: _one(next(J.make_jpeg_writer(32, 32)(iter([pd.DataFrame({"media_id": [5]})])))),
    "mjpeg": lambda: _one(next(MJ.make_mjpeg_writer()(iter([pd.DataFrame({"media_id": [5]})])))),
    "tar": lambda: _one(
        TAR.make_tar_packer()(
            pd.DataFrame(
                [[3, 3, "hello", "en", "web"]],
                columns=["doc_id", "shard", "text", "lang", "source"],
            )
        )
    ),
    "zip": lambda: _one(
        ZIP.make_zip_packer()(
            pd.DataFrame([[3, 2, "hello" * 30]], columns=["doc_id", "bundle", "text"])
        )
    ),
}

_DECODERS = {
    "adpcm": lambda b: next(AD.make_adpcm_decoder()(iter([pd.DataFrame({"media_id": [5], "payload": [b]})]))),
    "flac": lambda b: next(FL.make_flac_decoder()(iter([pd.DataFrame({"media_id": [5], "payload": [b]})]))),
    "gif": lambda b: next(GIF.make_gif_decoder()(iter([pd.DataFrame({"media_id": [5], "payload": [b]})]))),
    "g711": lambda b: next(G7.make_g711_decoder()(iter([pd.DataFrame({"media_id": [5], "payload": [b]})]))),
    "jpeg": lambda b: next(J.make_jpeg_decoder()(iter([pd.DataFrame({"media_id": [5], "payload": [b]})]))),
    "mjpeg": lambda b: next(MJ.make_mjpeg_decoder()(iter([pd.DataFrame({"media_id": [5], "payload": [b]})]))),
    "tar": lambda b: next(TAR.make_tar_reader()(iter([pd.DataFrame({"shard": [3], "payload": [b], "n_members": [2]})]))),
    "zip": lambda b: next(ZIP.make_zip_reader()(iter([pd.DataFrame({"bundle": [2], "payload": [b], "n_members": [1]})]))),
}

N_FLIPS = 150


@pytest.mark.parametrize("kind", sorted(_DECODERS))
def test_single_bit_flips_never_leak_internal_exceptions(kind):
    base = _PAYLOADS[kind]()
    decode = _DECODERS[kind]
    rng = random.Random(20260814)
    leaks = []
    for _ in range(N_FLIPS):
        b = bytearray(base)
        i = rng.randrange(len(b))
        b[i] ^= 1 << rng.randrange(8)
        try:
            decode(bytes(b))
        except ValueError:
            pass
        except Exception as e:  # noqa: BLE001
            leaks.append((i, type(e).__name__, str(e)[:60]))
    assert not leaks, f"{kind}: non-ValueError escaped on corrupt input: {leaks[:5]}"
