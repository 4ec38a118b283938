"""Baseline JPEG (JFIF) codec — the COMPRESSED image format a production
multimodal pipeline actually ingests — with zero external libraries.

VERDICT r4's top remaining multimodal gap was compressed-codec decode
(JPEG/MP3/H.264), previously env-gated on PIL/ffmpeg. This module removes
the JPEG leg of that gate: a genuine baseline sequential JFIF encoder AND
decoder (markers, DQT/DHT/SOF0/SOS parsing, canonical Huffman coding of DC
diffs + AC run-lengths with byte stuffing, zigzag, quantization, and an
8×8 block DCT) implemented in pure numpy integer arithmetic, run as two
chained Arrow-batched ``mapInPandas`` stages exactly like the PNG pair
(``multimodal.make_png_writer``/``make_png_decoder``).

Determinism policy (the round-4 chi-square lesson applied to a codec):
the DCT basis is a HARDCODED integer table (scale 2^13, antisymmetric by
construction), not runtime ``cos`` calls — libm cosine differs across
platforms in the last ulp and a rounded basis built at worker runtime
could differ by 1 on boundary values. With the hardcoded basis every
encode/decode step is integer arithmetic: bit-identical bytes and pixels
on every platform.

Oracle strategy: JPEG is LOSSY, so the oracle cannot recompute pixel sums
from the generating formula the way the PPM/PNG oracles do. Instead the
gate images are built from FLAT 8×8 blocks, for which the full codec
collapses to an exact closed form (a flat block has one nonzero DCT
coefficient, and both the general integer FDCT and the general integer
IDCT are EXACTLY closed-form on such blocks — pinned by
``tests/test_jpeg_codec.py`` over every possible block value, against
independent arithmetic). The DuckDB oracle evaluates that closed form:
quantize DC → dequantize → flat IDCT → clip. The Spark side must arrive
at the same numbers through the entire real codec — marker writing and
parsing, Huffman encode/decode of signed DC diffs, EOB handling, byte
stuffing, zigzag, quantization, and the integer transforms — so any
byte-level mistake flips the hash. Non-flat content (where the loss is
real) is covered by the crafted roundtrip tests, not the exact gate.

Scope: baseline sequential, 8-bit, single-component (grayscale), one scan
— the JFIF profile every decoder must support. Progressive/arithmetic
coding and chroma subsampling are out of scope (documented, not stubbed).

Scale shape: two chained narrow mapInPandas stages — zero shuffles,
Arrow batches end-to-end, linear in partitions.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from us_flight_bigdata_dashboard_spark.sources.catalog import load_table

JPEG_W, JPEG_H = 32, 32
JPEG_BLOCKS = (JPEG_W // 8) * (JPEG_H // 8)

# Integer DCT-II basis, scale 2^13: B[u][x] = round(8192·c(u)·cos((2x+1)uπ/16)),
# c(0)=1/(2√2), c(u≥1)=1/2 — right half derived by symmetry so odd rows sum to
# EXACTLY zero and flat blocks produce exactly one nonzero coefficient.
# Forward: F = (B·X·Bᵀ + 2^25) >> 26; inverse: X = (Bᵀ·F·B + 2^25) >> 26.
DCT_BASIS = [
    [2896, 2896, 2896, 2896, 2896, 2896, 2896, 2896],
    [4017, 3406, 2276, 799, -799, -2276, -3406, -4017],
    [3784, 1567, -1567, -3784, -3784, -1567, 1567, 3784],
    [3406, -799, -4017, -2276, 2276, 4017, 799, -3406],
    [2896, -2896, -2896, 2896, 2896, -2896, -2896, 2896],
    [2276, -4017, 799, 3406, -3406, -799, 4017, -2276],
    [1567, -3784, 3784, -1567, -1567, 3784, -3784, 1567],
    [799, -2276, 3406, -4017, 4017, -3406, 2276, -799],
]
_B00_SQ = DCT_BASIS[0][0] * DCT_BASIS[0][0]  # 8386816
_BIAS, _SHIFT_DIV = 1 << 25, 1 << 26

# ITU-T T.81 Annex K luminance quantization table (natural row-major order).
QTABLE = [
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
]

# Canonical baseline Huffman tables (T.81 Annex K): (BITS[1..16], HUFFVAL).
DC_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_VALS = list(range(12))
AC_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 125]
AC_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
    0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
    0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
    0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
    0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
    0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
    0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
    0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
    0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
    0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
    0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
    0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
    0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
]


def zigzag_perm() -> list[int]:
    """Natural (row-major) index for each zigzag position, generated by the
    standard diagonal walk (not hardcoded — the walk IS the spec)."""
    order = []
    r = c = 0
    for _ in range(64):
        order.append(r * 8 + c)
        if (r + c) % 2 == 0:  # moving up-right
            if c == 7:
                r += 1
            elif r == 0:
                c += 1
            else:
                r -= 1
                c += 1
        else:  # moving down-left
            if r == 7:
                c += 1
            elif c == 0:
                r += 1
            else:
                r += 1
                c -= 1
    return order


def flat_block_value(v: int) -> int:
    """Closed form for the decoded pixel of a FLAT 8×8 block of value v
    through the full codec — the oracle's arithmetic (independent of the
    encoder/decoder implementations; the identity with the general paths
    is pinned by tests over all 256 values)."""
    q00 = QTABLE[0]
    dc = (64 * (v - 128) * _B00_SQ + _BIAS) >> 26
    if dc >= 0:
        dcq = (dc + q00 // 2) // q00
    else:
        dcq = -((-dc + q00 // 2) // q00)
    rec = ((dcq * q00 * _B00_SQ + _BIAS) >> 26) + 128
    return min(max(rec, 0), 255)


def gate_block_value(media_id: int, b: int) -> int:
    """The gate images' generating formula: block b of media_id is flat
    with this value (nonnegative level-shifted domain keeps the oracle's
    integer divisions floor-free)."""
    return 128 + ((media_id * 7 + b * 13) % 128)


def make_jpeg_writer(width: int, height: int, pixel_fn=None):
    """mapInPandas worker: a REAL baseline JFIF encoder. Renders each
    media_id's pixels (default: the flat-block gate formula; tests inject
    ``pixel_fn(media_id) -> HxW uint8 array`` for arbitrary content), then
    produces genuine JPEG bytes: integer FDCT, Annex-K quantization,
    zigzag, Huffman-coded DC diffs + AC run-lengths with byte stuffing,
    and full marker structure (SOI/APP0/DQT/SOF0/DHT/SOS/EOI).

    Self-contained closure (pickled by value; captured args are plain
    ints/lists/functions). Integer-only arithmetic throughout."""
    basis, qtab = DCT_BASIS, QTABLE
    dc_bits, dc_vals, ac_bits, ac_vals = DC_BITS, DC_VALS, AC_BITS, AC_VALS
    zz = zigzag_perm()
    blocks_w, blocks_h = width // 8, height // 8

    def default_pixels(mid, _np):
        b = _np.arange(blocks_h * blocks_w, dtype=_np.int64)
        v = (128 + ((mid * 7 + b * 13) % 128)).astype(_np.uint8)
        return v.reshape(blocks_h, blocks_w).repeat(8, axis=0).repeat(8, axis=1)

    def write(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import struct

        import numpy as _np
        import pandas as _pd

        B = _np.array(basis, dtype=_np.int64)
        Q = _np.array(qtab, dtype=_np.int64).reshape(8, 8)

        def canonical_codes(bits, vals):
            codes, code, k = {}, 0, 0
            for length in range(1, 17):
                for _ in range(bits[length - 1]):
                    codes[vals[k]] = (code, length)
                    code += 1
                    k += 1
                code <<= 1
            return codes

        dc_codes = canonical_codes(dc_bits, dc_vals)
        ac_codes = canonical_codes(ac_bits, ac_vals)

        class BitWriter:
            def __init__(self):
                self.out = bytearray()
                self.acc = 0
                self.nbits = 0

            def put(self, value, length):
                self.acc = (self.acc << length) | (value & ((1 << length) - 1))
                self.nbits += length
                nb = self.nbits >> 3
                if nb:
                    # flush whole bytes in bulk; byte stuffing via one
                    # replace (identical bytes to the per-byte loop)
                    self.nbits -= 8 * nb
                    chunk = (self.acc >> self.nbits).to_bytes(nb, "big")
                    self.acc &= (1 << self.nbits) - 1
                    if b"\xff" in chunk:
                        chunk = chunk.replace(b"\xff", b"\xff\x00")
                    self.out += chunk

            def flush(self):
                if self.nbits:
                    pad = 8 - self.nbits
                    self.put((1 << pad) - 1, pad)

        def seg(marker, payload):
            return bytes([0xFF, marker]) + struct.pack(">H", len(payload) + 2) + payload

        def dht(cls_id, bits, vals):
            return seg(0xC4, bytes([cls_id]) + bytes(bits) + bytes(vals))

        header = (
            b"\xff\xd8"
            + seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
            + seg(0xDB, bytes([0x00]) + bytes(qtab[zz[i]] for i in range(64)))
            + seg(
                0xC0,
                struct.pack(">BHHB", 8, height, width, 1) + bytes([1, 0x11, 0]),
            )
            + dht(0x00, dc_bits, dc_vals)
            + dht(0x10, ac_bits, ac_vals)
            + seg(0xDA, bytes([1, 1, 0x00, 0, 63, 0]))
        )

        zz_idx = _np.array(zz, dtype=_np.int64)

        def encode_image(px):
            shifted = px.astype(_np.int64) - 128
            # all blocks at once: (nb, 8, 8) batched integer DCT + quantize
            # + zigzag via numpy indexing; only the Huffman bit loop stays
            # per-coefficient Python
            blocks = (
                shifted.reshape(blocks_h, 8, blocks_w, 8)
                .transpose(0, 2, 1, 3)
                .reshape(-1, 8, 8)
            )
            Fc = (B @ blocks @ B.T + (1 << 25)) >> 26
            Fq = _np.where(Fc >= 0, (Fc + Q // 2) // Q, -((-Fc + Q // 2) // Q))
            zzed = Fq.reshape(-1, 64)[:, zz_idx]
            nonzero_last = _np.where(
                (zzed[:, 1:] != 0).any(axis=1),
                63 - _np.argmax((zzed[:, :0:-1] != 0), axis=1),
                0,
            )
            bw = BitWriter()
            prev_dc = 0
            for bi in range(zzed.shape[0]):
                z = zzed[bi].tolist()
                diff = z[0] - prev_dc
                prev_dc = z[0]
                mag = diff if diff >= 0 else -diff
                cat = mag.bit_length()
                code, ln = dc_codes[cat]
                bw.put(code, ln)
                if cat:
                    bw.put(diff if diff >= 0 else diff + (1 << cat) - 1, cat)
                run = 0
                last_nz = int(nonzero_last[bi])
                for i in range(1, 64):
                    if i > last_nz:
                        code, ln = ac_codes[0x00]  # EOB
                        bw.put(code, ln)
                        break
                    if z[i] == 0:
                        run += 1
                        continue
                    while run > 15:
                        code, ln = ac_codes[0xF0]  # ZRL
                        bw.put(code, ln)
                        run -= 16
                    mag = z[i] if z[i] >= 0 else -z[i]
                    size = mag.bit_length()
                    code, ln = ac_codes[(run << 4) | size]
                    bw.put(code, ln)
                    bw.put(z[i] if z[i] >= 0 else z[i] + (1 << size) - 1, size)
                    run = 0
            bw.flush()
            return header + bytes(bw.out) + b"\xff\xd9"

        for pdf in batches:
            ids, payloads = [], []
            for mid in pdf["media_id"]:
                mid = int(mid)
                px = pixel_fn(mid) if pixel_fn else default_pixels(mid, _np)
                ids.append(mid)
                payloads.append(encode_image(px))
            yield _pd.DataFrame({"media_id": ids, "payload": payloads})

    return write


def make_jpeg_decoder():
    """mapInPandas worker: a GENUINE baseline JFIF decoder — marker walk,
    DQT (zigzag-stored) / SOF0 / DHT (canonical code reconstruction from
    the FILE's tables, not this module's constants) / SOS parsing, entropy
    decode with byte unstuffing, Huffman DC-diff + AC run-length decode
    (EOB/ZRL), dezigzag, dequantize, integer IDCT, level shift + clip.
    Emits integer-exact luminance stats; any byte-level mistake anywhere
    in the chain fails the closed-form oracle."""

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import re as _re
        import struct

        import numpy as _np
        import pandas as _pd

        basis = _np.array(DCT_BASIS_LOCAL, dtype=_np.int64)
        zz = ZIGZAG_LOCAL
        zz_arr = _np.array(zz, dtype=_np.int64)

        def build_codes(bits, vals):
            table, code, k = {}, 0, 0
            for length in range(1, 17):
                for _ in range(bits[length - 1]):
                    table[(length, code)] = vals[k]
                    code += 1
                    k += 1
                code <<= 1
            return table

        # r15: every image in a task carries the same DHT bytes (the
        # writer always emits Annex-K), so cache the reconstructed code
        # dict per raw segment, plus an 8-bit PEEK table (code-prefix →
        # (symbol, length) for every code ≤ 8 bits — prefix-free codes
        # make the peek resolution identical to the bit-at-a-time walk;
        # longer codes fall back to it).
        _code_cache: dict[bytes, tuple] = {}

        def build_codes_cached(seg: bytes, bits, vals):
            hit = _code_cache.get(seg)
            if hit is not None:
                return hit
            full = build_codes(bits, vals)
            peek = [None] * 256
            for (length, code), val in full.items():
                if length <= 8:
                    base = code << (8 - length)
                    for sfx in range(1 << (8 - length)):
                        peek[base | sfx] = (val, length)
            out = (full, peek)
            _code_cache[seg] = out
            return out

        def parse(b):
            if b[:2] != b"\xff\xd8":
                raise ValueError("not a JPEG (no SOI)")
            pos = 2
            qt, huff, dims = {}, {}, None
            while pos < len(b):
                if b[pos] != 0xFF:
                    raise ValueError(f"marker sync lost at {pos}")
                marker = b[pos + 1]
                if marker == 0xD9:  # EOI
                    break
                (seglen,) = struct.unpack(">H", b[pos + 2 : pos + 4])
                payload = b[pos + 4 : pos + 2 + seglen]
                if marker == 0xDB:  # DQT (zigzag order on disk)
                    p = 0
                    while p < len(payload):
                        pq, tq = payload[p] >> 4, payload[p] & 0xF
                        if pq != 0:
                            raise ValueError("16-bit DQT unsupported")
                        tab = [0] * 64
                        for i in range(64):
                            tab[zz[i]] = payload[p + 1 + i]
                        qt[tq] = tab
                        p += 65
                elif marker == 0xC0:  # SOF0 baseline
                    prec, h, w, ncomp = struct.unpack(">BHHB", payload[:6])
                    if prec != 8 or ncomp != 1:
                        raise ValueError("only 8-bit grayscale baseline supported")
                    comp_q = payload[8]
                    dims = (w, h, comp_q)
                elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7):
                    raise ValueError("non-baseline SOF unsupported")
                elif marker == 0xC4:  # DHT
                    p = 0
                    while p < len(payload):
                        cls_id = payload[p]
                        bits = list(payload[p + 1 : p + 17])
                        nv = sum(bits)
                        vals = list(payload[p + 17 : p + 17 + nv])
                        huff[(cls_id >> 4, cls_id & 0xF)] = build_codes_cached(
                            bytes(payload[p : p + 17 + nv]), bits, vals
                        )
                        p += 17 + nv
                elif marker == 0xDA:  # SOS → entropy data follows
                    dc_id, ac_id = payload[2] >> 4, payload[2] & 0xF
                    scan_start = pos + 2 + seglen
                    return dims, qt, huff, dc_id, ac_id, scan_start
                pos += 2 + seglen
            raise ValueError("no SOS found")

        _scan_end_re = _re.compile(rb"\xff(?!\x00)")

        def unstuff(b, start):
            # r15: locate the first non-stuffed 0xFF with one regex scan
            # and unstuff with one bytes.replace — same bytes, same error
            # classes/messages as the per-byte loop it replaces.
            m = _scan_end_re.search(b, start)
            if m is None:
                return b[start:].replace(b"\xff\x00", b"\xff")
            i = m.start()
            nxt = b[i + 1] if i + 1 < len(b) else None
            if nxt is None:
                raise ValueError("truncated scan: dangling 0xFF")
            if nxt != 0xD9:
                raise ValueError(f"unexpected marker FF{nxt:02x} in scan")
            return b[start:i].replace(b"\xff\x00", b"\xff")

        class BitReader:
            """r15: the unstuffed scan becomes ONE big integer; bit reads
            are a shift+mask instead of a per-bit indexing loop."""

            def __init__(self, data):
                self.data = data
                self.pos = 0
                self.nbits = len(data) * 8
                self.big = int.from_bytes(data, "big")

            def bits(self, n):
                if self.pos + n > self.nbits:
                    raise ValueError("truncated entropy data: bit stream exhausted")
                v = (self.big >> (self.nbits - self.pos - n)) & ((1 << n) - 1)
                self.pos += n
                return v

            def bit(self):
                return self.bits(1)

            def peek8(self):
                avail = self.nbits - self.pos
                if avail >= 8:
                    return (self.big >> (avail - 8)) & 0xFF
                if avail <= 0:
                    return 0
                return (self.big & ((1 << avail) - 1)) << (8 - avail)

        def huff_decode(br, table):
            full, peek = table
            hit = peek[br.peek8()]
            if hit is not None:
                val, length = hit
                if br.pos + length > br.nbits:
                    raise ValueError("truncated entropy data: bit stream exhausted")
                br.pos += length
                return val
            code, length = 0, 0
            while length < 17:
                code = (code << 1) | br.bit()
                length += 1
                sym = full.get((length, code))
                if sym is not None:
                    return sym
            raise ValueError("invalid Huffman code")

        def extend(v, size):
            return v if v >= (1 << (size - 1)) else v - (1 << size) + 1

        for pdf in batches:
            out: dict[str, list] = {
                k: []
                for k in ("media_id", "width", "height", "n_blocks", "sum_lum")
            }
            def decode_one(b: bytes):
                (w, h, comp_q), qt, huff, dc_id, ac_id, scan_at = parse(b)
                Q = _np.array(qt[comp_q], dtype=_np.int64).reshape(8, 8)
                dc_tab, ac_tab = huff[(0, dc_id)], huff[(1, ac_id)]
                br_ = BitReader(unstuff(b, scan_at))
                bw_, bh_ = (w + 7) // 8, (h + 7) // 8
                prev_dc = 0
                # entropy-decode every block's zigzag coefficients first,
                # then do dezigzag + dequantize + IDCT + clip for ALL
                # blocks in one batched numpy pass (r15 — the per-block
                # 8×8 matmuls and flat-index loops dominated decode time)
                zrows = []
                for _ in range(bh_ * bw_):
                    z = [0] * 64
                    size = huff_decode(br_, dc_tab)
                    diff = extend(br_.bits(size), size) if size else 0
                    prev_dc += diff
                    z[0] = prev_dc
                    i = 1
                    while i < 64:
                        sym = huff_decode(br_, ac_tab)
                        if sym == 0x00:  # EOB
                            break
                        if sym == 0xF0:  # ZRL
                            i += 16
                            continue
                        run, size = sym >> 4, sym & 0xF
                        i += run
                        if i > 63:
                            raise ValueError("AC index overflow")
                        z[i] = extend(br_.bits(size), size)
                        i += 1
                    zrows.append(z)
                zarr = _np.array(zrows, dtype=_np.int64).reshape(len(zrows), 64)
                Fn = _np.zeros((bh_ * bw_, 64), dtype=_np.int64)
                Fn[:, zz_arr] = zarr
                Fn = Fn.reshape(-1, 8, 8) * Q
                blk = ((basis.T @ Fn @ basis + (1 << 25)) >> 26) + 128
                img = (
                    _np.clip(blk, 0, 255)
                    .reshape(bh_, bw_, 8, 8)
                    .transpose(0, 2, 1, 3)
                    .reshape(bh_ * 8, bw_ * 8)
                )
                return w, h, bw_ * bh_, int(img[:h, :w].sum())

            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                # decode error boundary: corrupt bytes must surface as a
                # diagnosable ValueError, never an internal IndexError/
                # KeyError/TypeError/struct.error (fuzz-enforced by
                # tests/test_codec_fuzz.py)
                try:
                    w, h, nblk, sl = decode_one(bytes(payload))
                except ValueError:
                    raise
                except (IndexError, KeyError, TypeError, OverflowError, struct.error) as e:
                    raise ValueError(
                        f"corrupt JPEG payload: {type(e).__name__}: {e}"
                    ) from e
                out["media_id"].append(int(mid))
                out["width"].append(int(w))
                out["height"].append(int(h))
                out["n_blocks"].append(int(nblk))
                out["sum_lum"].append(sl)
            yield _pd.DataFrame(out)

    # Constants the closure needs, bound as defaults-by-value so cloudpickle
    # ships them without importing this module on workers.
    DCT_BASIS_LOCAL = DCT_BASIS
    ZIGZAG_LOCAL = zigzag_perm()
    return decode


JPEG_DECODE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_blocks", T.IntegerType()),
        T.StructField("sum_lum", T.LongType()),
    ]
)

_WRITER_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("payload", T.BinaryType()),
    ]
)


def q_multimodal_jpeg_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COMPRESSED-codec (JPEG) decode under the exact gate: each document
    id is encoded into a REAL baseline JFIF file by one Arrow-batched
    worker and independently decoded by a full JPEG parser in another —
    Huffman entropy coding, byte stuffing, zigzag, quantization, and the
    integer DCT pair all round-trip through genuine JPEG bytes.

    The oracle evaluates the flat-block CLOSED FORM of the lossy pipeline
    (quantize DC → dequantize → flat IDCT → clip) from the pixel
    generating formula — it never sees bytes, so encoder and decoder must
    BOTH be byte-correct and arithmetic-exact for the hash to match. See
    the module docstring for why flat blocks make a lossy codec exactly
    verifiable."""
    # single-file table → repartition the ids so the codec work fans out
    # (see flac_codec.q_multimodal_flac_decode)
    docs = load_table(spark, sf_dir, "documents")
    media = docs.select(F.col("doc_id").alias("media_id")).repartition(
        spark.sparkContext.defaultParallelism
    )
    jpegs = media.mapInPandas(make_jpeg_writer(JPEG_W, JPEG_H), _WRITER_SCHEMA)
    return jpegs.mapInPandas(make_jpeg_decoder(), JPEG_DECODE_SCHEMA)


def _sql_jpeg_decode() -> str:
    q00 = QTABLE[0]
    # Mirrors flat_block_value()/gate_block_value() in exact nonneg integer
    # arithmetic (v ≥ 128 ⇒ every intermediate is nonnegative, so integer
    # division needs no floor/truncation care).
    return f"""
WITH blocks AS (
  SELECT doc_id AS media_id,
         128 + ((doc_id * 7 + t.b * 13) % 128) AS v
  FROM documents, range(0, {JPEG_BLOCKS}) AS t(b)
), px AS (
  SELECT media_id,
         LEAST(GREATEST(
           (((((64 * (v - 128) * {_B00_SQ} + {_BIAS}) // {_SHIFT_DIV})
              + {q00 // 2}) // {q00}) * {q00} * {_B00_SQ} + {_BIAS})
             // {_SHIFT_DIV} + 128,
           0), 255) AS pix
  FROM blocks
)
SELECT media_id,
       {JPEG_W} AS width,
       {JPEG_H} AS height,
       {JPEG_BLOCKS} AS n_blocks,
       CAST(SUM(64 * pix) AS BIGINT) AS sum_lum
FROM px
GROUP BY media_id
"""


QUERIES = {
    "multimodal_jpeg_decode": q_multimodal_jpeg_decode,
}

ORACLE = {
    "multimodal_jpeg_decode": _sql_jpeg_decode(),
}
