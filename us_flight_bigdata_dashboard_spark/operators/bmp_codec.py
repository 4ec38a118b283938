"""Windows BMP / BI_RLE8 codec under the exact gate — run-length decode.

The TENTH byte-level codec and a compression family the shelf lacked:

- JPEG  — DCT + quantization + Huffman      (operators/jpeg_codec.py)
- PNG   — zlib DEFLATE + scanline filters   (operators/multimodal.py)
- FLAC  — linear prediction + Rice coding   (operators/flac_codec.py)
- GIF   — LZW dictionary coding             (operators/gif_codec.py)
- BMP   — **RLE8 run-length with escapes**  (this module)

RLE8 is mechanically small but full of REAL format traps, all exercised:
rows are stored BOTTOM-UP (positive biHeight), the palette is BGRX quads
(blue first — a decoder reading RGB inverts every luminance), absolute
mode (escape 00 03..FF) must be padded to a WORD boundary when its length
is odd, escape 00 00 ends a line / 00 01 ends the bitmap / 00 02 is a
position delta this encoder never emits and the decoder explicitly
rejects, and literal stretches of length 1-2 cannot use absolute mode
(00 01/00 02 would collide with the escapes) so they must fall back to
count-1 encoded pairs. The decode is lossless, so the oracle states the
pixel generating formula directly; any run/escape/padding/palette-order
bug on either side breaks the hash. Reference analog: none (extension
scope — SURVEY.md §2.7 multimodal additions).

The gate image mixes long runs (encoded mode) with per-pixel "noise"
spikes every 17 pixels (absolute mode), so BOTH packing modes and the
odd-length padding path are exercised by the driver gate itself, not
just by pytest.

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

BMP_W, BMP_H = 62, 33  # odd-ish dims: absolute chunks hit the padding path
BMP_RUN = 5  # smooth-region run length → encoded mode is genuinely used
BMP_SPIKE = 17  # every 17th/18th pixel is per-pixel noise → absolute mode

# pixel(mid, i) = noise (i % 17 < 2):   (mid*53 + i*7) % 256
#                 smooth   otherwise:   (mid*29 + (i div 5)*13) % 256
_NZ_MUL, _NZ_STEP = 53, 7
_SM_MUL, _SM_STEP = 29, 13

# permuted BGR palette: pal[v] = (B, G, R) = ((v*3)%256, (v*5)%256, (v*7)%256)
# — non-identity so a decoder shortcutting index→gray (or reading the quads
# as RGB) fails the gate
_PAL_B, _PAL_G, _PAL_R = 3, 5, 7


def _pixels(mid: int) -> list[int]:
    return [
        (mid * _NZ_MUL + i * _NZ_STEP) % 256
        if i % BMP_SPIKE < 2
        else (mid * _SM_MUL + (i // BMP_RUN) * _SM_STEP) % 256
        for i in range(BMP_W * BMP_H)
    ]


def _palette() -> list[tuple[int, int, int]]:
    """(B, G, R) triples — stored order of the BMP quad."""
    return [
        ((v * _PAL_B) % 256, (v * _PAL_G) % 256, (v * _PAL_R) % 256)
        for v in range(256)
    ]


BMP_WRITE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("payload", T.BinaryType()),
    ]
)

BMP_DECODE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_pixels", T.IntegerType()),
        T.StructField("sum_lum", T.LongType()),
        T.StructField("sum_sq", T.LongType()),
    ]
)


def make_bmp_writer(pixel_fn=None, palette=None):
    """mapInPandas worker: (media_id) → (media_id, payload), payload a real
    BMP (BITMAPFILEHEADER + 40-byte BITMAPINFOHEADER with BI_RLE8 +
    256-entry BGRX palette + bottom-up RLE8 stream). ``pixel_fn(mid) ->
    list[int]`` (row-major, top-down) and ``palette`` (256 (b,g,r)
    triples) override the gate defaults for tests."""

    def write(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import struct as _struct

        def rle8_row(row: bytes) -> bytearray:
            # maximal equal runs; runs >= 3 → encoded pairs; consecutive
            # short runs pool into a literal buffer flushed as absolute
            # mode (length >= 3, padded to WORD) or 1-2 encoded pairs
            out = bytearray()
            lit = bytearray()

            def flush_lit():
                nonlocal lit
                while len(lit) >= 3:
                    chunk = lit[:255]
                    # an absolute chunk may not leave a 1-2 byte remainder
                    # (it could not be flushed as absolute mode and would
                    # re-pair anyway) — shrink to keep the tail >= 3
                    if 0 < len(lit) - len(chunk) < 3:
                        chunk = lit[: len(lit) - 3]
                    out.append(0x00)
                    out.append(len(chunk))
                    out.extend(chunk)
                    if len(chunk) % 2:
                        out.append(0x00)  # WORD-align absolute mode
                    lit = lit[len(chunk) :]
                for b in lit:  # 1-2 stragglers → encoded pairs of count 1
                    out.append(0x01)
                    out.append(b)
                lit = bytearray()

            i = 0
            while i < len(row):
                j = i
                while j + 1 < len(row) and row[j + 1] == row[i]:
                    j += 1
                run = j - i + 1
                if run >= 3:
                    flush_lit()
                    left = run
                    while left > 0:
                        n = min(left, 255)
                        out.append(n)
                        out.append(row[i])
                        left -= n
                else:
                    lit += row[i : j + 1]
                i = j + 1
            flush_lit()
            return out

        def encode_one(mid: int) -> bytes:
            px = pixel_fn(mid) if pixel_fn is not None else _px_default(mid)
            pal = palette if palette is not None else _pal_default()
            rle = bytearray()
            # bottom-up row order — the BMP storage order
            for r in range(BMP_H - 1, -1, -1):
                row = bytes(px[r * BMP_W : (r + 1) * BMP_W])
                rle += rle8_row(row)
                if r != 0:
                    rle += b"\x00\x00"  # end of line
            rle += b"\x00\x01"  # end of bitmap
            off = 14 + 40 + 4 * 256
            out = bytearray()
            out += b"BM" + _struct.pack("<IHHI", off + len(rle), 0, 0, off)
            out += _struct.pack(
                "<IiiHHIIiiII",
                40, BMP_W, BMP_H, 1, 8, 1, len(rle), 2835, 2835, 256, 0,
            )
            for b, g, rr in pal:
                out += bytes((b, g, rr, 0))
            out += rle
            return bytes(out)

        def _px_default(mid: int) -> list[int]:
            return [
                (mid * _NZ_MUL + i * _NZ_STEP) % 256
                if i % BMP_SPIKE < 2
                else (mid * _SM_MUL + (i // BMP_RUN) * _SM_STEP) % 256
                for i in range(BMP_W * BMP_H)
            ]

        def _pal_default() -> list[tuple[int, int, int]]:
            return [
                ((v * _PAL_B) % 256, (v * _PAL_G) % 256, (v * _PAL_R) % 256)
                for v in range(256)
            ]

        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": [int(m) for m in pdf["media_id"]],
                    "payload": [encode_one(int(m)) for m in pdf["media_id"]],
                }
            )

    return write


def make_bmp_decoder():
    """mapInPandas worker: (media_id, payload) → integer-exact decode stats.

    A genuine BMP parse: both headers validated field by field, the BGRX
    palette read in STORED order (blue first), then the RLE8 walk —
    encoded runs, absolute mode with WORD padding, end-of-line /
    end-of-bitmap escapes, delta escape rejected, bottom-up row
    reassembly, row-overflow and pixel-count enforcement — and luminance
    computed THROUGH the palette (ITU-ish integer weights 299R + 587G +
    114B; exact integer arithmetic, no doubles)."""

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import struct as _struct

        def decode_one(b: bytes):
            if b[:2] != b"BM":
                raise ValueError("not a BMP stream")
            fsize, _r1, _r2, off = _struct.unpack("<IHHI", b[2:14])
            if fsize != len(b):
                raise ValueError("file-header size mismatch")
            (
                bisize, w, h, planes, bpp, comp, simg,
                _xppm, _yppm, clrused, _clrimp,
            ) = _struct.unpack("<IiiHHIIiiII", b[14:54])
            if bisize != 40:
                raise ValueError("not a BITMAPINFOHEADER")
            if planes != 1 or bpp != 8:
                raise ValueError("not an 8-bit BMP")
            if comp != 1:
                raise ValueError("not BI_RLE8")
            if h <= 0:
                raise ValueError("top-down RLE BMPs are invalid")
            ncol = clrused or 256
            pal = []
            pos = 54
            for _ in range(ncol):
                bb, gg, rr, _x = b[pos : pos + 4]
                pal.append((bb, gg, rr))
                pos += 4
            if pos != off:
                raise ValueError("palette size does not reach the pixel offset")
            rle = b[off:]
            if simg != len(rle):
                raise ValueError("biSizeImage mismatch")
            rows: list[list[int]] = [[] for _ in range(h)]
            y = 0  # bottom row first
            x = 0
            i = 0
            done = False
            while i < len(rle):
                c = rle[i]
                if c > 0:  # encoded run
                    v = rle[i + 1]
                    i += 2
                    x += c
                    if y >= h or x > w:
                        raise ValueError("run overflows the row")
                    rows[y] += [v] * c
                    continue
                esc = rle[i + 1]
                i += 2
                if esc == 0:  # end of line
                    if x != w:
                        raise ValueError("end-of-line before the row filled")
                    y += 1
                    x = 0
                elif esc == 1:  # end of bitmap
                    if x != w or y != h - 1:
                        raise ValueError("end-of-bitmap before the image filled")
                    done = True
                    break
                elif esc == 2:
                    raise ValueError("delta escape not produced here")
                else:  # absolute mode
                    n = esc
                    chunk = rle[i : i + n]
                    if len(chunk) != n:
                        raise ValueError("truncated absolute block")
                    i += n
                    if n % 2:
                        if i >= len(rle) or rle[i] != 0:
                            raise ValueError("absolute block not WORD-padded")
                        i += 1
                    x += n
                    if y >= h or x > w:
                        raise ValueError("absolute block overflows the row")
                    rows[y] += list(chunk)
            if not done:
                raise ValueError("missing end-of-bitmap escape")
            # bottom-up storage → top-down raster
            px = []
            for r in range(h - 1, -1, -1):
                if len(rows[r]) != w:
                    raise ValueError("incomplete row after decode")
                px += rows[r]
            lums = [
                299 * pal[v][2] + 587 * pal[v][1] + 114 * pal[v][0] for v in px
            ]
            return (
                w,
                h,
                len(px),
                sum(lums),
                sum(v * v for v in lums),
            )

        for pdf in batches:
            out: dict[str, list] = {k: [] for k in (
                "media_id", "width", "height", "n_pixels", "sum_lum", "sum_sq",
            )}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                try:
                    w, h, n, sl, ss = decode_one(bytes(payload))
                except ValueError:
                    raise
                except (IndexError, KeyError, TypeError, OverflowError, _struct.error) as e:
                    raise ValueError(
                        f"corrupt BMP payload: {type(e).__name__}: {e}"
                    ) from e
                out["media_id"].append(int(mid))
                out["width"].append(w)
                out["height"].append(h)
                out["n_pixels"].append(n)
                out["sum_lum"].append(sl)
                out["sum_sq"].append(ss)
            yield pd.DataFrame(out)

    return decode


def q_multimodal_bmp_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RLE8-compressed image ingest under the exact gate: every document
    id becomes a real bottom-up BI_RLE8 BMP (mixed encoded/absolute
    packing, WORD-padded odd absolute chunks, permuted BGR palette),
    decoded back byte-by-byte. Lossless, so the oracle is the pixel
    generating formula with the palette permutation applied in SQL —
    a decoder that misreads BGRX as RGBX, skips the padding, or
    forgets the bottom-up order cannot hash-match."""
    media = (
        load_table(spark, sf_dir, "documents")
        .select(F.col("doc_id").alias("media_id"))
        .repartition(spark.sparkContext.defaultParallelism)
    )
    bmps = media.mapInPandas(make_bmp_writer(), BMP_WRITE_SCHEMA)
    return bmps.mapInPandas(make_bmp_decoder(), BMP_DECODE_SCHEMA)


def _sql_bmp_decode() -> str:
    lum = (
        f"(299 * ((v * {_PAL_R}) % 256)"
        f" + 587 * ((v * {_PAL_G}) % 256)"
        f" + 114 * ((v * {_PAL_B}) % 256))"
    )
    return f"""
WITH px AS (
  SELECT doc_id,
         CASE WHEN p % {BMP_SPIKE} < 2
              THEN (doc_id * {_NZ_MUL} + p * {_NZ_STEP}) % 256
              ELSE (doc_id * {_SM_MUL} + (p // {BMP_RUN}) * {_SM_STEP}) % 256
         END AS v
  FROM documents, unnest(generate_series(0, {BMP_W * BMP_H - 1})) AS t(p)
)
SELECT doc_id AS media_id,
       {BMP_W} AS width, {BMP_H} AS height,
       {BMP_W * BMP_H} AS n_pixels,
       CAST(SUM({lum}) AS BIGINT) AS sum_lum,
       CAST(SUM({lum} * {lum}) AS BIGINT) AS sum_sq
FROM px
GROUP BY doc_id
"""


QUERIES = {
    "multimodal_bmp_decode": q_multimodal_bmp_decode,
}

ORACLE = {
    "multimodal_bmp_decode": _sql_bmp_decode(),
}
