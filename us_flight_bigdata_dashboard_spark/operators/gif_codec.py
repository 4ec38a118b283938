"""Baseline GIF87a/89a codec under the exact gate — LZW image decode.

Completes the compressed-codec quartet, each a different compression
family proven on real bytes inside Arrow-batched ``mapInPandas`` workers:

- JPEG  — DCT + quantization + Huffman   (operators/jpeg_codec.py)
- PNG   — zlib DEFLATE + scanline filters (operators/multimodal.py)
- FLAC  — linear prediction + Rice coding (operators/flac_codec.py)
- GIF   — **LZW dictionary coding** (this module)

GIF's LZW is the interesting one mechanically: variable-width codes packed
**LSB-first** (the opposite bit order of FLAC/JPEG's MSB-first streams),
a dictionary rebuilt on the fly by both sides, the KwKwK corner case
(a code referencing the entry being defined), dynamic code-width growth
(9→10→11 bits as the table fills — exercised: the gate image has 3072
pixels and its table reaches ~1647 entries, crossing both 512 and 1024),
and 255-byte sub-block framing. The decode is lossless, so the oracle states the pixel
generating formula directly; any bit-order/dictionary/width bug on either
side breaks the hash. Reference analog: none (extension scope).

The well-known encoder/decoder code-width asymmetry is handled the
standard way: the encoder widens after inserting entry ``1 << width``,
the decoder (whose inserts lag one code behind) widens at
``(1 << width) - 1``.

Pixels are 8-bit indexes into a REAL 256-entry global color table; the
decoder computes luminance THROUGH the palette (a decoder shortcutting
index→gray breaks on the permuted-palette test). All integer arithmetic —
platform-portable by construction.

All worker helpers are NESTED closures (pickled by value — Spark's Python
workers cannot import this package; see multimodal.py).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from us_flight_bigdata_dashboard_spark.sources.catalog import load_table

GIF_W, GIF_H = 64, 48  # 3072 pixels → LZW table reaches ~1647 entries,
# crossing BOTH the 512 (9→10 bit) and 1024 (10→11 bit) width boundaries
GIF_RUN = 7  # gate image: runs of 7 equal pixels → genuinely compressible

# pixel(mid, i) = (mid·37 + (i div RUN)·11) mod 256   (i row-major)
_PX_MUL, _PX_STEP = 37, 11


def _pixels(mid: int) -> list[int]:
    return [
        (mid * _PX_MUL + (i // GIF_RUN) * _PX_STEP) % 256
        for i in range(GIF_W * GIF_H)
    ]


GIF_WRITE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("payload", T.BinaryType()),
    ]
)

GIF_DECODE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_pixels", T.IntegerType()),
        T.StructField("sum_lum", T.LongType()),
        T.StructField("sum_sq", T.LongType()),
    ]
)


def make_gif_writer(pixel_fn=None, palette=None):
    """mapInPandas worker: (media_id) → (media_id, payload), payload a real
    GIF89a (header, logical screen descriptor, 256-entry global color
    table, image descriptor, LZW-compressed 8-bit index stream in ≤255-byte
    sub-blocks, trailer). ``pixel_fn(mid) -> list[int]`` and ``palette``
    (256 (r,g,b) triples) override the gate defaults for tests."""

    def write(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import struct as _struct

        def lzw_encode(data: bytes, min_code_size: int = 8) -> bytes:
            # Hot path: int-keyed chain dict ((prefix_code<<8)|byte — root
            # strings are implicit) + byte-accumulator LSB-first packing.
            # A bytes-keyed dict with per-bit emission measured ~10× slower
            # over the sf0.1 corpus (SCALE probe, round 6). r15: the
            # ``emit`` closure is inlined into the loop with local-variable
            # packing state (same codes, same bytes — closure-call overhead
            # per emitted code was ~40% of encode time).
            clear, eoi = 1 << min_code_size, (1 << min_code_size) + 1
            table: dict[int, int] = {}
            next_code, width = eoi + 1, min_code_size + 1
            acc, nbits, out = 0, 0, bytearray()
            out_append = out.append
            tget = table.get
            it = iter(data)

            # emit(clear, width)
            acc |= clear << nbits
            nbits += width
            while nbits >= 8:
                out_append(acc & 0xFF)
                acc >>= 8
                nbits -= 8
            w_code = next(it)  # a root code == its byte value
            for ch in it:
                key = (w_code << 8) | ch
                nxt = tget(key)
                if nxt is not None:
                    w_code = nxt
                    continue
                acc |= w_code << nbits  # emit(w_code, width)
                nbits += width
                while nbits >= 8:
                    out_append(acc & 0xFF)
                    acc >>= 8
                    nbits -= 8
                if next_code < 4096:
                    table[key] = next_code
                    next_code += 1
                    if next_code == (1 << width) and width < 12:
                        width += 1
                else:  # table full → reset (classic, non-deferred)
                    acc |= clear << nbits  # emit(clear, width)
                    nbits += width
                    while nbits >= 8:
                        out_append(acc & 0xFF)
                        acc >>= 8
                        nbits -= 8
                    table = {}
                    tget = table.get
                    next_code, width = eoi + 1, min_code_size + 1
                w_code = ch
            acc |= w_code << nbits  # emit(w_code, width)
            nbits += width
            while nbits >= 8:
                out_append(acc & 0xFF)
                acc >>= 8
                nbits -= 8
            # Tail width sync (hypothesis-found, round 10): the decoder
            # still INSERTS upon this final data code (the encoder has no
            # following char so it skipped its insert), so when that
            # insert lands exactly on 2^width − 1 the decoder widens
            # BEFORE reading EOI — mirror the bump or EOI is written one
            # bit narrower than it is read ("truncated LZW stream" on
            # patterns whose last emitted code sits on a width boundary).
            # After a clear with no intervening insert next_code is 258,
            # never 2^w − 1, so the first-code-after-clear case (where
            # the decoder does NOT insert) can never false-trigger this.
            if next_code == (1 << width) - 1 and width < 12:
                width += 1
            acc |= eoi << nbits  # emit(eoi, width)
            nbits += width
            while nbits >= 8:
                out_append(acc & 0xFF)
                acc >>= 8
                nbits -= 8
            if nbits:
                out_append(acc & 0xFF)
            return bytes(out)

        import numpy as _np

        _run_idx = _np.arange(GIF_W * GIF_H, dtype=_np.int64) // GIF_RUN

        def encode_one(mid: int) -> bytes:
            px = (
                pixel_fn(mid)
                if pixel_fn is not None
                else ((mid * _PX_MUL + _run_idx * _PX_STEP) % 256)
                .astype(_np.uint8)
                .tobytes()
            )
            pal = palette if palette is not None else [(i, i, i) for i in range(256)]
            out = bytearray(b"GIF89a")
            # logical screen descriptor: GCT present, 8-bit color, 256 entries
            out += _struct.pack("<HHBBB", GIF_W, GIF_H, 0xF7, 0, 0)
            for r, g, bl in pal:
                out += bytes((r, g, bl))
            # image descriptor, no local color table, not interlaced
            out += b"\x2c" + _struct.pack("<HHHHB", 0, 0, GIF_W, GIF_H, 0)
            out.append(8)  # LZW minimum code size
            comp = lzw_encode(bytes(px))
            for i in range(0, len(comp), 255):
                block = comp[i : i + 255]
                out.append(len(block))
                out += block
            out += b"\x00\x3b"  # block terminator + trailer
            return bytes(out)

        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": [int(m) for m in pdf["media_id"]],
                    "payload": [encode_one(int(m)) for m in pdf["media_id"]],
                }
            )

    return write


def make_gif_decoder():
    """mapInPandas worker: (media_id, payload) → integer-exact decode stats.

    A genuine GIF parse: header/LSD fields, global color table load,
    sub-block reassembly, LSB-first variable-width LZW decode with the
    KwKwK case and the decoder-side early width bump, then luminance
    computed THROUGH the palette (ITU-ish integer weights 299/587/114 over
    10³ — exact integer arithmetic, no doubles)."""

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import struct as _struct

        import numpy as _np

        def lzw_decode(comp: bytes, min_code_size: int, n_expected: int) -> bytes:
            clear, eoi = 1 << min_code_size, (1 << min_code_size) + 1
            # byte-accumulator LSB-first reader (per-bit loops measured ~10×
            # slower over the sf0.1 corpus — SCALE probe, round 6); r15:
            # the ``read`` closure is inlined with local packing state
            # (same codes, same errors — closure-call overhead per code
            # was ~30% of decode time)
            acc, nbits, bi = 0, 0, 0
            n_comp = len(comp)

            table: list[bytes] = [bytes([i]) for i in range(clear)] + [b"", b""]
            width = min_code_size + 1
            out = bytearray()
            prev: bytes | None = None
            while True:
                while nbits < width:  # code = read(width)
                    if bi >= n_comp:
                        raise ValueError("truncated LZW stream")
                    acc |= comp[bi] << nbits
                    bi += 1
                    nbits += 8
                code = acc & ((1 << width) - 1)
                acc >>= width
                nbits -= width
                if code == clear:
                    table = table[: eoi + 1]
                    width = min_code_size + 1
                    prev = None
                    continue
                if code == eoi:
                    break
                if prev is None:
                    if code >= len(table):
                        raise ValueError("first code not a root")
                    entry = table[code]
                else:
                    if code < len(table):
                        entry = table[code]
                    elif code == len(table):  # KwKwK
                        entry = prev + prev[:1]
                    else:
                        raise ValueError(f"LZW code {code} beyond table")
                    table.append(prev + entry[:1])
                    # decoder inserts lag the encoder by one code → widen early
                    if len(table) == (1 << width) - 1 and width < 12:
                        width += 1
                out += entry
                prev = entry
                if len(out) > n_expected:
                    raise ValueError("LZW output exceeds image size")
            if len(out) != n_expected:
                raise ValueError(
                    f"LZW output {len(out)} != expected {n_expected} pixels"
                )
            return bytes(out)

        def decode_one(b: bytes):
            if b[:6] not in (b"GIF87a", b"GIF89a"):
                raise ValueError("not a GIF stream")
            w, h, packed, _bg, _ar = _struct.unpack("<HHBBB", b[6:13])
            if not packed & 0x80:
                raise ValueError("no global color table")
            gct_size = 2 << (packed & 0x07)
            pos = 13
            pal = [tuple(b[pos + 3 * i : pos + 3 * i + 3]) for i in range(gct_size)]
            pos += 3 * gct_size
            # skip extension blocks until the image descriptor
            while b[pos] == 0x21:
                pos += 2
                while b[pos] != 0:
                    pos += 1 + b[pos]
                pos += 1
            if b[pos] != 0x2C:
                raise ValueError(f"expected image descriptor, got {b[pos]:#x}")
            left, top, iw, ih, ipacked = _struct.unpack("<HHHHB", b[pos + 1 : pos + 10])
            if ipacked & 0x40:
                raise ValueError("interlaced GIFs not produced here")
            if ipacked & 0x80:
                raise ValueError("local color tables not produced here")
            pos += 10
            min_code_size = b[pos]
            pos += 1
            comp = bytearray()
            while b[pos] != 0:
                n = b[pos]
                comp += b[pos + 1 : pos + 1 + n]
                pos += 1 + n
            pos += 1
            if b[pos] != 0x3B:
                raise ValueError("missing trailer")
            idx = lzw_decode(bytes(comp), min_code_size, iw * ih)
            idx_arr = _np.frombuffer(idx, dtype=_np.uint8)
            if idx_arr.size and int(idx_arr.max()) >= gct_size:
                raise ValueError("pixel index outside color table")
            # integer luminance through the palette (exact: ÷1000 deferred
            # to the aggregate domain by keeping the ×1000 sum) — one
            # 256-entry palette gather instead of a per-pixel Python
            # loop (r15; sums are exact int64: lum ≤ 255,000, squares
            # ≤ 6.6e10, × 3072 pixels ≪ 2⁶³)
            pal_lum = _np.array(
                [299 * r + 587 * g + 114 * bl for r, g, bl in pal],
                dtype=_np.int64,
            )
            lums = pal_lum[idx_arr]
            sum_lum = int(lums.sum())
            sum_sq = int((lums * lums).sum())
            return iw, ih, len(idx), sum_lum, sum_sq

        for pdf in batches:
            out: dict[str, list] = {k: [] for k in (
                "media_id", "width", "height", "n_pixels", "sum_lum", "sum_sq",
            )}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                # decode error boundary (fuzz-enforced): corrupt bytes →
                # diagnosable ValueError, never internal IndexError etc.
                try:
                    iw, ih, n, sl, ss = decode_one(bytes(payload))
                except ValueError:
                    raise
                except (IndexError, KeyError, TypeError, OverflowError, _struct.error) as e:
                    raise ValueError(
                        f"corrupt GIF payload: {type(e).__name__}: {e}"
                    ) from e
                out["media_id"].append(int(mid))
                out["width"].append(iw)
                out["height"].append(ih)
                out["n_pixels"].append(n)
                out["sum_lum"].append(sl)
                out["sum_sq"].append(ss)
            yield pd.DataFrame(out)

    return decode


def q_multimodal_gif_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LZW-compressed image ingest under the exact gate: every document id
    becomes a real GIF89a, decoded back through sub-block reassembly +
    variable-width LSB-first LZW + palette lookup. Lossless, so the oracle
    is the pixel generating formula; with the identity grayscale palette
    the ×1000 luminance of index i is exactly 1000·i."""
    # single-file table → repartition the ids so the codec work fans out
    # (see flac_codec.q_multimodal_flac_decode)
    media = (
        load_table(spark, sf_dir, "documents")
        .select(F.col("doc_id").alias("media_id"))
        .repartition(spark.sparkContext.defaultParallelism)
    )
    gifs = media.mapInPandas(make_gif_writer(), GIF_WRITE_SCHEMA)
    return gifs.mapInPandas(make_gif_decoder(), GIF_DECODE_SCHEMA)


def _sql_gif_decode() -> str:
    return f"""
WITH px AS (
  SELECT doc_id,
         (doc_id * {_PX_MUL} + (p // {GIF_RUN}) * {_PX_STEP}) % 256 AS v
  FROM documents, unnest(generate_series(0, {GIF_W * GIF_H - 1})) AS t(p)
)
SELECT doc_id AS media_id,
       {GIF_W} AS width, {GIF_H} AS height,
       {GIF_W * GIF_H} AS n_pixels,
       CAST(SUM(1000 * v) AS BIGINT) AS sum_lum,
       CAST(SUM(1000 * v * 1000 * v) AS BIGINT) AS sum_sq
FROM px
GROUP BY doc_id
"""


QUERIES = {
    "multimodal_gif_decode": q_multimodal_gif_decode,
}

ORACLE = {
    "multimodal_gif_decode": _sql_gif_decode(),
}
