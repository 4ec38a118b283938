"""Multimodal plumbing tests: binary payload column → Arrow-batched
mapInPandas decode over genuine byte-level codecs."""

from __future__ import annotations

import pytest

from us_flight_bigdata_dashboard_spark.operators.multimodal import (
    media_from_documents,
)

SF_DIR = "/root/testdata/sf0.001"


def test_payload_is_binary_and_pruned_schema(spark):
    media = media_from_documents(spark, SF_DIR)
    assert dict(media.dtypes)["payload"] == "binary"
    assert set(media.columns) == {"media_id", "kind", "payload"}


def test_ppm_decoder_parses_real_bytes_and_rejects_garbage(spark):
    """The PPM worker must decode genuine hand-built bytes correctly
    (known 2x1 image) and raise on a wrong magic number."""
    import pandas as pd
    import pytest

    from us_flight_bigdata_dashboard_spark.operators.multimodal import make_ppm_decoder

    decode = make_ppm_decoder()
    # 2x1 image: pixels (1,2,3) and (250,251,252)
    payload = b"P6\n2 1\n255\n" + bytes([1, 2, 3, 250, 251, 252])
    pdf = pd.DataFrame({"media_id": [7], "payload": [payload]})
    out = pd.concat(list(decode(iter([pdf]))))
    row = out.iloc[0]
    assert (row["width"], row["height"], row["n_pixels"]) == (2, 1, 2)
    assert (row["sum_r"], row["sum_g"], row["sum_b"]) == (251, 253, 255)

    bad = pd.DataFrame({"media_id": [8], "payload": [b"P5\n1 1\n255\n\x00"]})
    with pytest.raises(ValueError, match="not a P6"):
        list(decode(iter([bad])))


def test_wav_decoder_chunk_walk_and_signedness(spark):
    """Hand-built WAV with known samples: +1, -1, -32768 — verifies the
    chunk walk, little-endian int16 decode, and sign handling."""
    import struct

    import pandas as pd
    import pytest

    from us_flight_bigdata_dashboard_spark.operators.multimodal import make_wav_decoder

    samples = [1, -1, -32768]
    data = b"".join(struct.pack("<h", s) for s in samples)
    hdr = (
        b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE"
        + b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, 8000, 16000, 2, 16)
        + b"data" + struct.pack("<I", len(data))
    )
    decode = make_wav_decoder()
    out = pd.concat(list(decode(iter([pd.DataFrame({"media_id": [3], "payload": [hdr + data]})]))))
    row = out.iloc[0]
    assert row["n_samples"] == 3
    assert row["sum_amp"] == 1 - 1 - 32768
    assert row["sum_sq"] == 1 + 1 + 32768 * 32768
    assert (row["sample_rate"], row["n_channels"], row["bits_per_sample"]) == (8000, 1, 16)

    with pytest.raises(ValueError, match="not a RIFF"):
        list(decode(iter([pd.DataFrame({"media_id": [4], "payload": [b"OGGS----"]})])))


def test_video_decoder_frame_extraction(spark):
    """Hand-built 2-frame 2x1 stream: frame sums must separate correctly."""
    import pandas as pd
    import pytest

    from us_flight_bigdata_dashboard_spark.operators.multimodal import make_video_decoder

    payload = b"VID\n2 1 2\n" + bytes([10, 20, 200, 250])
    decode = make_video_decoder()
    out = pd.concat(list(decode(iter([pd.DataFrame({"media_id": [5], "payload": [payload]})]))))
    sums = {r["frame_idx"]: r["frame_sum"] for _, r in out.iterrows()}
    assert sums == {0: 30, 1: 450}
    assert set(out["width"]) == {2} and set(out["height"]) == {1}

    with pytest.raises(ValueError, match="not a VID"):
        list(decode(iter([pd.DataFrame({"media_id": [6], "payload": [b"XXX\n1 1 1\n\x00"]})])))


def test_wav_chunk_decoder_segments_real_bytes(spark):
    """Hand-built WAV longer than one segment: per-segment sums and the
    short tail segment must be exact."""
    import struct

    import pandas as pd

    import us_flight_bigdata_dashboard_spark.operators.multimodal as mm

    samples = list(range(1, mm.AUDIO_CHUNK_SAMPLES + 3))  # one full + 2-tail
    data = b"".join(struct.pack("<h", s) for s in samples)
    hdr = (
        b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE"
        + b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, 8000, 16000, 2, 16)
        + b"data" + struct.pack("<I", len(data))
    )
    decode = mm.make_wav_chunk_decoder()
    out = pd.concat(list(decode(iter([pd.DataFrame({"media_id": [9], "payload": [hdr + data]})]))))
    out = out.sort_values("seg_idx").reset_index(drop=True)
    c = mm.AUDIO_CHUNK_SAMPLES
    assert list(out["seg_len"]) == [c, 2]
    assert list(out["seg_start"]) == [0, c]
    assert out.iloc[0]["sum_amp"] == sum(samples[:c])
    assert out.iloc[1]["sum_amp"] == sum(samples[c:])
    assert out.iloc[1]["sum_sq"] == sum(s * s for s in samples[c:])


def test_phash_neardup_groups_and_separation(tmp_path, spark):
    """Near-dup pairs land exactly within the by-construction id groups:
    8 docs -> groups {0..3} and {4..7}; all 6 within-group pairs found
    with small hamming, zero cross-group pairs (their hashes differ far
    beyond the threshold)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from us_flight_bigdata_dashboard_spark.operators.multimodal import (
        PHASH_MAX_HAMMING,
        q_multimodal_phash_neardup,
    )

    pq.write_table(
        pa.table({"doc_id": pa.array(range(8), pa.int64())}),
        str(tmp_path / "documents.parquet"),
    )
    rows = q_multimodal_phash_neardup(spark, str(tmp_path)).collect()
    pairs = {(r["media_a"], r["media_b"]) for r in rows}
    within = {(a, b) for g in (0, 4) for a in range(g, g + 4) for b in range(a + 1, g + 4)}
    assert pairs == within
    assert all(r["hamming"] <= PHASH_MAX_HAMMING for r in rows)


def test_png_roundtrip_filters_and_crc_rejection():
    """The PNG writer/reader pair: (a) roundtrips formula pixels through a
    real zlib-compressed container with mixed scanline filters, (b) the
    reader REJECTS a payload whose chunk CRC was tampered with, and (c)
    the reader correctly unfilters Average and Paeth rows the writer never
    emits (hand-built payload)."""
    import struct
    import zlib

    import numpy as np
    import pandas as pd

    from us_flight_bigdata_dashboard_spark.operators.multimodal import (
        PNG_H,
        PNG_W,
        make_png_decoder,
        make_png_writer,
    )

    write, decode = make_png_writer(), make_png_decoder()
    [pngs] = list(write(iter([pd.DataFrame({"media_id": [7]})])))
    [stats] = list(decode(iter([pngs])))
    idx = np.arange(PNG_W * PNG_H * 3, dtype=np.int64)
    px = (7 * 31 + idx) % 256
    assert int(stats["sum_r"][0]) == int(px[0::3].sum())
    assert int(stats["sum_g"][0]) == int(px[1::3].sum())
    assert int(stats["sum_b"][0]) == int(px[2::3].sum())

    # (b) flip one byte inside the IDAT payload -> CRC check must fire
    raw = bytearray(pngs["payload"][0])
    raw[8 + 25 + 8 + 5] ^= 0xFF  # a byte inside IDAT data (after IHDR chunk)
    with pytest.raises(ValueError, match="CRC"):
        list(decode(iter([pd.DataFrame({"media_id": [7], "payload": [bytes(raw)]})])))

    # (c) hand-build a 2-row image using Average (3) and Paeth (4) filters
    w, h = 2, 2
    rows = [bytes([10, 20, 30, 40, 50, 60]), bytes([70, 80, 90, 100, 110, 120])]
    stride = w * 3
    flt = bytearray()
    # row 0 with filter 3 (Average): filt = raw - (left+up)//2 (up = 0)
    f0 = bytes([(rows[0][i] - ((rows[0][i - 3] if i >= 3 else 0) + 0) // 2) % 256 for i in range(stride)])
    # row 1 with filter 4 (Paeth): predictor of (left, up, upleft)
    def paeth(a, b, c):
        p = a + b - c
        pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
        return a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
    f1 = bytes(
        [
            (
                rows[1][i]
                - paeth(
                    rows[1][i - 3] if i >= 3 else 0,
                    rows[0][i],
                    rows[0][i - 3] if i >= 3 else 0,
                )
            )
            % 256
            for i in range(stride)
        ]
    )
    scan = bytes([3]) + f0 + bytes([4]) + f1
    def chunk(tag, payload):
        return struct.pack(">I", len(payload)) + tag + payload + struct.pack(
            ">I", zlib.crc32(tag + payload) & 0xFFFFFFFF
        )
    png = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(scan))
        + chunk(b"IEND", b"")
    )
    [st] = list(decode(iter([pd.DataFrame({"media_id": [1], "payload": [png]})])))
    all_px = rows[0] + rows[1]
    assert int(st["sum_r"][0]) == sum(all_px[0::3])
    assert int(st["sum_g"][0]) == sum(all_px[1::3])
    assert int(st["sum_b"][0]) == sum(all_px[2::3])
