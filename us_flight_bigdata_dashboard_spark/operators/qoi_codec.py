"""QOI ("Quite OK Image") codec under the exact gate — the ELEVENTH
byte-level codec and a compression family the shelf lacked:

- JPEG — DCT + quantization + Huffman       (operators/jpeg_codec.py)
- PNG  — zlib DEFLATE + scanline filters    (operators/multimodal.py)
- FLAC — linear prediction + Rice coding    (operators/flac_codec.py)
- GIF  — LZW dictionary coding              (operators/gif_codec.py)
- BMP  — RLE8 run-length with escapes       (operators/bmp_codec.py)
- QOI  — **stateful op-stream coding**      (this module)

QOI (qoiformat.org, public single-page spec) is the minimal STATEFUL
image code: the decoder carries three pieces of running state — the
previous pixel, a 64-slot recently-seen-color array keyed by the spec
hash (3r+5g+7b+11a) mod 64, and a pending run length — and the stream
is a sequence of six op kinds (RUN / INDEX / DIFF / LUMA / RGB / RGBA)
whose 2-bit tags collide with the 8-bit tags at run lengths 63-64 (the
spec's one sharp edge: runs cap at 62). Real traps, all exercised: the
wraparound int8 arithmetic of DIFF/LUMA, the LUMA green-anchored
deltas, the index array's zero-init colliding with opaque black, the
big-endian header, and the 8-byte end marker. The gate image cycles
through a revisited color palette (INDEX), constant stretches (RUN),
±1 gradients (DIFF), green-anchored +2/+3/+4 gradients (LUMA), and
hard jumps (RGB), so every op kind is live in the driver gate itself
(asserted in tests/test_qoi_codec.py against the actual stream).

The code is lossless, so the oracle states the pixel generating
formula directly in SQL; any op/state/wraparound bug on either side
breaks the hash. Reference analog: none (extension scope — SURVEY.md
§2.7 multimodal additions).

All worker helpers are NESTED closures (pickled by value — Spark's
Python workers cannot import this package; see multimodal.py).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from us_flight_bigdata_dashboard_spark.sources.catalog import load_table

QOI_W, QOI_H = 40, 25  # 1000 px — every op kind appears in each image
_QOI_PHASE = 101  # region cycle length (pixel phases)
_QOI_PAL_N = 6  # revisited palette size (INDEX-op fuel)

# region layout within each 101-pixel phase cycle:
#   phase  0..39  — constant palette color (RUN; INDEX on re-entry)
#   phase 40..69  — +1/+1/+1 gradient (DIFF)
#   phase 70..100 — +3/+2/+4 gradient (LUMA: dg=+2, dr-dg=+1, db-dg=+2)
_RUN_END, _DIFF_END = 40, 70

# palette color v -> (R,G,B) = ((v*37+11)%256, (v*59+23)%256, (v*83+5)%256)
_PAL_R_MUL, _PAL_R_ADD = 37, 11
_PAL_G_MUL, _PAL_G_ADD = 59, 23
_PAL_B_MUL, _PAL_B_ADD = 83, 5


def qoi_pixels(mid: int) -> list[tuple[int, int, int]]:
    """The gate image: RGB triples, row-major — the ground truth both
    the encoder input and the SQL oracle restate."""
    out = []
    for i in range(QOI_W * QOI_H):
        cyc, ph = divmod(i, _QOI_PHASE)
        if ph < _RUN_END:
            v = (mid + cyc) % _QOI_PAL_N
            out.append(
                (
                    (v * _PAL_R_MUL + _PAL_R_ADD) % 256,
                    (v * _PAL_G_MUL + _PAL_G_ADD) % 256,
                    (v * _PAL_B_MUL + _PAL_B_ADD) % 256,
                )
            )
        elif ph < _DIFF_END:
            out.append(
                (
                    (mid * 7 + ph) % 256,
                    (mid * 11 + ph) % 256,
                    (mid * 13 + ph) % 256,
                )
            )
        else:
            out.append(
                (
                    (mid * 5 + 3 * ph) % 256,
                    (mid * 17 + 2 * ph) % 256,
                    (mid * 19 + 4 * ph) % 256,
                )
            )
    return out


QOI_WRITE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("payload", T.BinaryType()),
    ]
)

QOI_DECODE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_pixels", T.IntegerType()),
        T.StructField("sum_lum", T.LongType()),
        T.StructField("sum_sq", T.LongType()),
    ]
)


def make_qoi_writer(pixel_fn=None):
    """mapInPandas worker: (media_id) → (media_id, payload), payload a
    real QOI stream (14-byte big-endian header, channels=3, the six-op
    body with the reference encoder's preference order run > index >
    diff > luma > rgb, 8-byte end marker). ``pixel_fn(mid) ->
    [(r,g,b), ...]`` overrides the gate image for tests."""

    def write(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import struct as _struct

        W, H = QOI_W, QOI_H
        PHASE, PAL_N = _QOI_PHASE, _QOI_PAL_N
        RUN_END, DIFF_END = _RUN_END, _DIFF_END
        PRM, PRA, PGM, PGA, PBM, PBA = (
            _PAL_R_MUL, _PAL_R_ADD, _PAL_G_MUL, _PAL_G_ADD, _PAL_B_MUL, _PAL_B_ADD,
        )

        def px_default(mid: int):
            out = []
            for i in range(W * H):
                cyc, ph = divmod(i, PHASE)
                if ph < RUN_END:
                    v = (mid + cyc) % PAL_N
                    out.append(
                        ((v * PRM + PRA) % 256, (v * PGM + PGA) % 256, (v * PBM + PBA) % 256)
                    )
                elif ph < DIFF_END:
                    out.append(((mid * 7 + ph) % 256, (mid * 11 + ph) % 256, (mid * 13 + ph) % 256))
                else:
                    out.append(((mid * 5 + 3 * ph) % 256, (mid * 17 + 2 * ph) % 256, (mid * 19 + 4 * ph) % 256))
            return out

        def encode_one(mid: int) -> bytes:
            px = pixel_fn(mid) if pixel_fn is not None else px_default(mid)
            out = bytearray()
            out += b"qoif" + _struct.pack(">IIBB", W, H, 3, 0)
            index = [(0, 0, 0, 255)] * 0 + [(0, 0, 0, 0)] * 64
            prev = (0, 0, 0, 255)
            run = 0
            for r, g, b in px:
                p = (r, g, b, 255)
                if p == prev:
                    run += 1
                    if run == 62:
                        out.append(0xC0 | (run - 1))
                        run = 0
                    continue
                if run:
                    out.append(0xC0 | (run - 1))
                    run = 0
                h = (r * 3 + g * 5 + b * 7 + 255 * 11) % 64
                if index[h] == p:
                    out.append(h)  # QOI_OP_INDEX (tag 0b00)
                else:
                    index[h] = p
                    dr = (r - prev[0] + 128) % 256 - 128
                    dg = (g - prev[1] + 128) % 256 - 128
                    db = (b - prev[2] + 128) % 256 - 128
                    if -2 <= dr <= 1 and -2 <= dg <= 1 and -2 <= db <= 1:
                        out.append(0x40 | ((dr + 2) << 4) | ((dg + 2) << 2) | (db + 2))
                    elif (
                        -32 <= dg <= 31
                        and -8 <= dr - dg <= 7
                        and -8 <= db - dg <= 7
                    ):
                        out.append(0x80 | (dg + 32))
                        out.append(((dr - dg + 8) << 4) | (db - dg + 8))
                    else:
                        out.append(0xFE)  # QOI_OP_RGB
                        out += bytes((r, g, b))
                prev = p
            if run:
                out.append(0xC0 | (run - 1))
            out += b"\x00" * 7 + b"\x01"
            return bytes(out)

        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": [int(m) for m in pdf["media_id"]],
                    "payload": [encode_one(int(m)) for m in pdf["media_id"]],
                }
            )

    return write


def make_qoi_decoder():
    """mapInPandas worker: (media_id, payload) → integer-exact decode
    stats. A genuine QOI parse: big-endian header validated field by
    field, the six-op state machine (previous pixel, 64-slot hash
    index, run state) with wraparound int8 DIFF/LUMA arithmetic, the
    index array updated after EVERY pixel exactly as the reference
    decoder does, pixel-count enforcement, and the 8-byte end marker
    checked byte for byte. Luminance 299R + 587G + 114B — exact
    integer arithmetic, no doubles."""

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import struct as _struct

        def decode_one(buf: bytes):
            if buf[:4] != b"qoif":
                raise ValueError("not a QOI stream")
            w, h, channels, colorspace = _struct.unpack(">IIBB", buf[4:14])
            if channels not in (3, 4):
                raise ValueError("bad channel count")
            if colorspace not in (0, 1):
                raise ValueError("bad colorspace")
            if buf[-8:] != b"\x00" * 7 + b"\x01":
                raise ValueError("missing end marker")
            body = buf[14:-8]
            n = w * h
            index = [(0, 0, 0, 0)] * 64
            px = (0, 0, 0, 255)
            out = []
            i = 0
            while len(out) < n:
                if i >= len(body):
                    raise ValueError("stream truncated before pixel count")
                b1 = body[i]
                i += 1
                if b1 == 0xFE:  # RGB
                    if i + 3 > len(body):
                        raise ValueError("stream truncated inside an RGB op")
                    px = (body[i], body[i + 1], body[i + 2], px[3])
                    i += 3
                elif b1 == 0xFF:  # RGBA
                    if i + 4 > len(body):
                        raise ValueError("stream truncated inside an RGBA op")
                    px = (body[i], body[i + 1], body[i + 2], body[i + 3])
                    i += 4
                else:
                    tag = b1 >> 6
                    if tag == 0b00:  # INDEX
                        px = index[b1 & 0x3F]
                    elif tag == 0b01:  # DIFF
                        dr = ((b1 >> 4) & 0x03) - 2
                        dg = ((b1 >> 2) & 0x03) - 2
                        db = (b1 & 0x03) - 2
                        px = (
                            (px[0] + dr) % 256,
                            (px[1] + dg) % 256,
                            (px[2] + db) % 256,
                            px[3],
                        )
                    elif tag == 0b10:  # LUMA
                        dg = (b1 & 0x3F) - 32
                        if i >= len(body):
                            raise ValueError("stream truncated inside a LUMA op")
                        b2 = body[i]
                        i += 1
                        dr = dg + ((b2 >> 4) & 0x0F) - 8
                        db = dg + (b2 & 0x0F) - 8
                        px = (
                            (px[0] + dr) % 256,
                            (px[1] + dg) % 256,
                            (px[2] + db) % 256,
                            px[3],
                        )
                    else:  # RUN
                        run = (b1 & 0x3F) + 1
                        if run > 62:
                            raise ValueError("run length collides with RGB tags")
                        if len(out) + run > n:
                            raise ValueError("run overflows the pixel count")
                        out += [px] * run
                        index[(px[0] * 3 + px[1] * 5 + px[2] * 7 + px[3] * 11) % 64] = px
                        continue
                    out.append(px)
                    index[(px[0] * 3 + px[1] * 5 + px[2] * 7 + px[3] * 11) % 64] = px
                    continue
                out.append(px)
                index[(px[0] * 3 + px[1] * 5 + px[2] * 7 + px[3] * 11) % 64] = px
            if i != len(body):
                raise ValueError("trailing bytes after the last pixel")
            lums = [299 * r + 587 * g + 114 * b for r, g, b, _a in out]
            return (w, h, len(out), sum(lums), sum(v * v for v in lums))

        for pdf in batches:
            cols: dict[str, list] = {
                k: [] for k in ("media_id", "width", "height", "n_pixels", "sum_lum", "sum_sq")
            }
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                try:
                    w, h, n, sl, ss = decode_one(bytes(payload))
                except ValueError:
                    raise
                except (IndexError, KeyError, TypeError, OverflowError, _struct.error) as e:
                    raise ValueError(
                        f"corrupt QOI payload: {type(e).__name__}: {e}"
                    ) from e
                cols["media_id"].append(int(mid))
                cols["width"].append(w)
                cols["height"].append(h)
                cols["n_pixels"].append(n)
                cols["sum_lum"].append(sl)
                cols["sum_sq"].append(ss)
            yield pd.DataFrame(cols)

    return decode


def q_multimodal_qoi_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stateful op-stream image ingest under the exact gate: every
    document id becomes a real QOI image (all six ops live — runs,
    index hits against the 64-slot hash array, wraparound DIFF/LUMA
    deltas, raw RGB jumps), decoded back byte-by-byte through the
    spec state machine. Lossless, so the oracle is the pixel
    generating formula in SQL; a decoder that mis-keys the hash
    array, drops the int8 wraparound, or mis-anchors the LUMA greens
    cannot hash-match. Scale shape: two Arrow-batched mapInPandas
    stages over an id-partitioned frame — embarrassingly parallel,
    no shuffle."""
    media = (
        load_table(spark, sf_dir, "documents")
        .select(F.col("doc_id").alias("media_id"))
        .repartition(spark.sparkContext.defaultParallelism)
    )
    qois = media.mapInPandas(make_qoi_writer(), QOI_WRITE_SCHEMA)
    return qois.mapInPandas(make_qoi_decoder(), QOI_DECODE_SCHEMA)


def _sql_qoi_decode() -> str:
    r = (
        f"CASE WHEN p % {_QOI_PHASE} < {_RUN_END}"
        f" THEN (((doc_id + p // {_QOI_PHASE}) % {_QOI_PAL_N}) * {_PAL_R_MUL} + {_PAL_R_ADD}) % 256"
        f" WHEN p % {_QOI_PHASE} < {_DIFF_END}"
        f" THEN (doc_id * 7 + p % {_QOI_PHASE}) % 256"
        f" ELSE (doc_id * 5 + 3 * (p % {_QOI_PHASE})) % 256 END"
    )
    g = (
        f"CASE WHEN p % {_QOI_PHASE} < {_RUN_END}"
        f" THEN (((doc_id + p // {_QOI_PHASE}) % {_QOI_PAL_N}) * {_PAL_G_MUL} + {_PAL_G_ADD}) % 256"
        f" WHEN p % {_QOI_PHASE} < {_DIFF_END}"
        f" THEN (doc_id * 11 + p % {_QOI_PHASE}) % 256"
        f" ELSE (doc_id * 17 + 2 * (p % {_QOI_PHASE})) % 256 END"
    )
    b = (
        f"CASE WHEN p % {_QOI_PHASE} < {_RUN_END}"
        f" THEN (((doc_id + p // {_QOI_PHASE}) % {_QOI_PAL_N}) * {_PAL_B_MUL} + {_PAL_B_ADD}) % 256"
        f" WHEN p % {_QOI_PHASE} < {_DIFF_END}"
        f" THEN (doc_id * 13 + p % {_QOI_PHASE}) % 256"
        f" ELSE (doc_id * 19 + 4 * (p % {_QOI_PHASE})) % 256 END"
    )
    lum = f"(299 * ({r}) + 587 * ({g}) + 114 * ({b}))"
    return f"""
WITH px AS (
  SELECT doc_id, CAST(p AS BIGINT) AS p
  FROM documents, unnest(generate_series(0, {QOI_W * QOI_H - 1})) AS t(p)
)
SELECT doc_id AS media_id,
       {QOI_W} AS width, {QOI_H} AS height,
       {QOI_W * QOI_H} AS n_pixels,
       CAST(SUM({lum}) AS BIGINT) AS sum_lum,
       CAST(SUM({lum} * {lum}) AS BIGINT) AS sum_sq
FROM px
GROUP BY doc_id
"""


QUERIES = {
    "multimodal_qoi_decode": q_multimodal_qoi_decode,
}

ORACLE = {
    "multimodal_qoi_decode": _sql_qoi_decode(),
}
