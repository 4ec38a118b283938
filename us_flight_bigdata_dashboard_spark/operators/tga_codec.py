"""Truevision TGA (type-10, RLE true-color) codec under the exact gate.

The TWELFTH byte-level codec, and the first TRUE-COLOR RLE member —
every earlier RLE-family codec compresses palette indices or samples
(BMP/RLE8 = 8-bit palette runs, GIF = LZW over indices, QOI = op-stream
over RGBA); TGA type-10 runs over 3-byte BGR PIXELS, so the run detector
must compare whole tuples and a channel-order bug corrupts every pixel.

Real-format traps, all exercised and all gate-visible:

- pixels are stored B, G, R (not RGB) — per-channel generator constants
  differ, so a swapped read fails the luminance hash;
- packet headers carry COUNT−1 with the RLE flag in bit 7: raw packet
  0x00..0x7F = 1..128 literal pixels, RLE packet 0x80..0xFF = 1..128
  copies of ONE pixel — the +1 and the 128 cap are both live;
- packets MUST NOT cross scan lines (TGA 2.0 spec) — the encoder flushes
  per row, the decoder enforces it;
- rows are stored BOTTOM-UP (image descriptor bit 5 = 0), like BMP;
- the TGA 2.0 FOOTER ("TRUEVISION-XFILE.\\0", 26 bytes) terminates the
  file and the decoder validates it byte-for-byte, plus exact byte-length
  accounting between pixel data and footer.

The gate image mixes smooth runs (RLE packets) with per-pixel noise
spikes (raw packets) so both packet kinds and the 128 cap are exercised
by the driver gate itself. The decode is lossless, so the oracle states
the per-channel pixel generating formula directly in SQL; any
run/count/order/footer bug on either side breaks the hash.

All worker helpers are NESTED closures (pickled by value — Spark's
Python workers cannot import this package; see multimodal.py).

Reference analog: none (extension scope — SURVEY.md §2.7 multimodal).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from us_flight_bigdata_dashboard_spark.sources.catalog import load_table

TGA_W, TGA_H = 57, 29  # odd-ish dims; rows are not multiples of packet caps
TGA_RUN = 6  # smooth-region run length → RLE packets genuinely used
TGA_SPIKE = 19  # every 19th/20th pixel is per-pixel noise → raw packets

# channel generators (k = pixel index in noise, run index in smooth):
# R = (mid*31 + k*7) % 256, G = (mid*37 + k*11) % 256, B = (mid*41 + k*13) % 256
_R_MUL, _R_STEP = 31, 7
_G_MUL, _G_STEP = 37, 11
_B_MUL, _B_STEP = 41, 13

_TGA_FOOTER = b"\x00\x00\x00\x00\x00\x00\x00\x00TRUEVISION-XFILE.\x00"

TGA_WRITE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("payload", T.BinaryType()),
    ]
)

TGA_DECODE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_pixels", T.IntegerType()),
        T.StructField("sum_lum", T.LongType()),
        T.StructField("sum_sq", T.LongType()),
    ]
)


def _pixels(mid: int) -> list[tuple[int, int, int]]:
    """Top-down raster of (R, G, B) tuples — the gate generating formula
    (mirrored by the oracle SQL and by the writer's nested copy)."""
    out = []
    for i in range(TGA_W * TGA_H):
        k = i if i % TGA_SPIKE < 2 else i // TGA_RUN
        out.append(
            (
                (mid * _R_MUL + k * _R_STEP) % 256,
                (mid * _G_MUL + k * _G_STEP) % 256,
                (mid * _B_MUL + k * _B_STEP) % 256,
            )
        )
    return out


def make_tga_writer(pixel_fn=None):
    """mapInPandas worker: (media_id) → (media_id, payload), payload a real
    TGA 2.0 file (18-byte header, type 10, 24 bpp, bottom-up RLE pixel
    data flushed per scan line, 26-byte v2 footer). ``pixel_fn(mid) ->
    list[(r,g,b)]`` (top-down raster) overrides the gate image for
    tests."""

    def write(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import struct as _struct

        W, H, RUN, SPIKE = TGA_W, TGA_H, TGA_RUN, TGA_SPIKE
        RM, RS, GM, GS, BM, BS = _R_MUL, _R_STEP, _G_MUL, _G_STEP, _B_MUL, _B_STEP
        FOOTER = _TGA_FOOTER

        def px_default(mid: int):
            out = []
            for i in range(W * H):
                k = i if i % SPIKE < 2 else i // RUN
                out.append(
                    (
                        (mid * RM + k * RS) % 256,
                        (mid * GM + k * GS) % 256,
                        (mid * BM + k * BS) % 256,
                    )
                )
            return out

        def rle_row(row) -> bytearray:
            # maximal equal-pixel runs; run >= 2 → RLE packets (<=128);
            # singletons pool into raw packets (<=128)
            out = bytearray()
            lit: list = []

            def flush_lit():
                nonlocal lit
                while lit:
                    chunk = lit[:128]
                    out.append(len(chunk) - 1)  # raw: bit7=0, count-1
                    for r, g, b in chunk:
                        out.extend((b, g, r))  # stored B, G, R
                    lit = lit[128:]

            i = 0
            while i < len(row):
                j = i
                while j + 1 < len(row) and row[j + 1] == row[i]:
                    j += 1
                run = j - i + 1
                if run >= 2:
                    flush_lit()
                    left = run
                    while left > 0:
                        n = min(left, 128)
                        out.append(0x80 | (n - 1))  # RLE: bit7=1, count-1
                        r, g, b = row[i]
                        out += bytes((b, g, r))
                        left -= n
                else:
                    lit.append(row[i])
                i = j + 1
            flush_lit()
            return out

        def encode_one(mid: int) -> bytes:
            px = pixel_fn(mid) if pixel_fn is not None else px_default(mid)
            out = bytearray()
            # 18-byte header: no id field, no colormap, type 10, 24 bpp,
            # descriptor 0 → bottom-left origin (rows stored bottom-up)
            out += _struct.pack(
                "<BBBHHBHHHHBB", 0, 0, 10, 0, 0, 0, 0, 0, W, H, 24, 0
            )
            for r in range(H - 1, -1, -1):  # bottom-up storage
                out += rle_row(px[r * W : (r + 1) * W])
            out += FOOTER
            return bytes(out)

        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": [int(m) for m in pdf["media_id"]],
                    "payload": [encode_one(int(m)) for m in pdf["media_id"]],
                }
            )

    return write


def make_tga_decoder():
    """mapInPandas worker: (media_id, payload) → integer-exact decode
    stats. A genuine TGA parse: header validated field by field, RLE/raw
    packets walked with the count−1 semantics and the no-row-crossing
    rule enforced, BGR read in stored order, bottom-up reassembly, v2
    footer verified byte-for-byte, exact byte accounting. Luminance =
    299R + 587G + 114B per pixel — exact integers, no doubles."""

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import struct as _struct

        FOOTER = _TGA_FOOTER

        def decode_one(b: bytes):
            if len(b) < 18 + len(FOOTER):
                raise ValueError("truncated TGA stream")
            (
                idlen, cmap, itype, _cmfirst, _cmlen, _cmdepth,
                _xo, _yo, w, h, bpp, desc,
            ) = _struct.unpack("<BBBHHBHHHHBB", b[:18])
            if idlen != 0 or cmap != 0:
                raise ValueError("unexpected id field / colormap")
            if itype != 10:
                raise ValueError("not an RLE true-color TGA")
            if bpp != 24:
                raise ValueError("not 24 bpp")
            if desc & 0x30 != 0:
                raise ValueError("expected bottom-left origin, no mirroring")
            if b[-len(FOOTER):] != FOOTER:
                raise ValueError("missing/invalid TGA 2.0 footer")
            data = b[18 : len(b) - len(FOOTER)]
            rows: list[list] = []
            i = 0
            for _ in range(h):
                row: list = []
                while len(row) < w:
                    if i >= len(data):
                        raise ValueError("pixel data ends mid-row")
                    hdr = data[i]
                    i += 1
                    n = (hdr & 0x7F) + 1
                    if len(row) + n > w:
                        raise ValueError("packet crosses the scan line")
                    if hdr & 0x80:  # RLE packet: one pixel, n copies
                        bb, gg, rr = data[i : i + 3]
                        i += 3
                        row += [(rr, gg, bb)] * n
                    else:  # raw packet: n literal pixels
                        chunk = data[i : i + 3 * n]
                        if len(chunk) != 3 * n:
                            raise ValueError("truncated raw packet")
                        i += 3 * n
                        for p in range(n):
                            bb, gg, rr = chunk[3 * p : 3 * p + 3]
                            row.append((rr, gg, bb))
                rows.append(row)
            if i != len(data):
                raise ValueError("trailing bytes after the last row")
            # bottom-up storage → top-down raster
            px = []
            for r in range(h - 1, -1, -1):
                px += rows[r]
            lums = [299 * r + 587 * g + 114 * bl for r, g, bl in px]
            return (w, h, len(px), sum(lums), sum(v * v for v in lums))

        for pdf in batches:
            out: dict[str, list] = {
                k: []
                for k in (
                    "media_id", "width", "height", "n_pixels", "sum_lum", "sum_sq",
                )
            }
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                try:
                    w, h, n, sl, ss = decode_one(bytes(payload))
                except ValueError:
                    raise
                except (IndexError, KeyError, TypeError, OverflowError, _struct.error) as e:
                    raise ValueError(
                        f"corrupt TGA payload: {type(e).__name__}: {e}"
                    ) from e
                out["media_id"].append(int(mid))
                out["width"].append(w)
                out["height"].append(h)
                out["n_pixels"].append(n)
                out["sum_lum"].append(sl)
                out["sum_sq"].append(ss)
            yield pd.DataFrame(out)

    return decode


def q_multimodal_tga_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """True-color RLE image ingest under the exact gate: every document
    id becomes a real bottom-up TGA 2.0 type-10 file (tuple-run RLE and
    raw packets, count−1 headers, per-row packet flushes, BGR storage,
    v2 footer), decoded back byte-by-byte. Lossless, so the oracle is
    the per-channel pixel generating formula in SQL — a decoder that
    misreads BGR as RGB, drops the +1, lets a packet cross a row, or
    skips the footer cannot hash-match. Per-media tasks: embarrassingly
    parallel at 100 TB (the `multimodal_bmp_decode` scaling argument)."""
    media = (
        load_table(spark, sf_dir, "documents")
        .select(F.col("doc_id").alias("media_id"))
        .repartition(spark.sparkContext.defaultParallelism)
    )
    tgas = media.mapInPandas(make_tga_writer(), TGA_WRITE_SCHEMA)
    return tgas.mapInPandas(make_tga_decoder(), TGA_DECODE_SCHEMA)


def _sql_tga_decode() -> str:
    k = f"(CASE WHEN p % {TGA_SPIKE} < 2 THEN p ELSE p // {TGA_RUN} END)"
    lum = (
        f"(299 * ((doc_id * {_R_MUL} + {k} * {_R_STEP}) % 256)"
        f" + 587 * ((doc_id * {_G_MUL} + {k} * {_G_STEP}) % 256)"
        f" + 114 * ((doc_id * {_B_MUL} + {k} * {_B_STEP}) % 256))"
    )
    return f"""
WITH px AS (
  SELECT doc_id, t.p AS p
  FROM documents, unnest(generate_series(0, {TGA_W * TGA_H - 1})) AS t(p)
)
SELECT doc_id AS media_id,
       {TGA_W} AS width, {TGA_H} AS height,
       {TGA_W * TGA_H} AS n_pixels,
       CAST(SUM({lum}) AS BIGINT) AS sum_lum,
       CAST(SUM({lum} * {lum}) AS BIGINT) AS sum_sq
FROM px
GROUP BY doc_id
"""


QUERIES = {
    "multimodal_tga_decode": q_multimodal_tga_decode,
}

ORACLE = {
    "multimodal_tga_decode": _sql_tga_decode(),
}
