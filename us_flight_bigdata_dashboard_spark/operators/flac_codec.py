"""Baseline FLAC codec under the exact gate — compressed AUDIO decode.

The audio twin of the JPEG milestone (operators/jpeg_codec.py): the sandbox
has no audio libraries, so the "compressed-codec ingest" capability is
proven the same way — implement the codec subset ourselves, on real bytes,
inside Arrow-batched ``mapInPandas`` workers, and hash-verify the decode
against a closed-form oracle. Unlike JPEG, FLAC is LOSSLESS: decode(encode
(pcm)) must equal the source PCM **bit-for-bit**, so the oracle needs no
quantization closed form — it states the PCM generating formula directly,
and any bit-reader/Rice/predictor/CRC bug in either direction breaks the
hash. Reference analog: none (extension scope — the reference is a batch
flight dashboard; this extends the multimodal ingest family in SURVEY.md
§2's spirit).

Implemented FLAC subset (what a real baseline encoder emits):

- stream = ``fLaC`` magic + STREAMINFO metadata block (including the
  **real MD5 of the unencoded PCM**, which the decoder re-computes and
  verifies — the spec's own end-to-end losslessness check),
- one frame per file: frame header (14-bit sync, blocksize/rate/channel/
  sample-size codes, UTF-8-coded frame number, **CRC-8**) + one mono
  subframe + frame footer **CRC-16** over the whole frame,
- subframe: FIXED predictor, order chosen 0–2 by minimum total residual
  magnitude (the standard heuristic), warmup samples verbatim,
- residuals: Rice coding (partition order 0), parameter chosen by
  exhaustive bit-count minimization — genuine entropy coding, the
  compression is real and the tests assert it.

Everything is integer arithmetic (predictor recurrences, zigzag, unary/
binary bit packing, CRC polynomials) — bit-identical on every platform,
so the gate's value hash is safe by construction (no transcendentals, no
doubles; see tests/test_numeric_portability.py).

Scale shape: identical to the other multimodal entries — the synthetic
payload builder and both codec passes are per-row ``mapInPandas`` workers
(embarrassingly parallel, no shuffle until the final tiny aggregate-free
projection); at 100 TB the same workers run over a binary column read
from parquet/object storage.

All worker helpers are NESTED closures (pickled by value): Spark's Python
workers cannot import this package, so a module-level helper referenced
from a UDF would die with ModuleNotFoundError at runtime (see
multimodal.make_decode_features_stub).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from us_flight_bigdata_dashboard_spark.sources.catalog import load_table

FLAC_SAMPLES = 64
FLAC_RATE = 8000  # frame-header rate code 0b0100
FLAC_BPS = 16

# PCM generating formula (shared by the writer worker and the oracle):
#   u(mid, i) = (mid·131 + i²·7) mod 65536;  sample = u − 65536 if u ≥ 32768
# The i² term makes the order-2 fixed predictor the natural winner (its
# second difference is the constant 14) except at wraparound points, so
# the Rice coder sees genuinely small residuals — real compression, not a
# verbatim store.
_PCM_MUL, _PCM_SQ = 131, 7


def _pcm_samples(mid: int) -> list[int]:
    out = []
    for i in range(FLAC_SAMPLES):
        u = (mid * _PCM_MUL + i * i * _PCM_SQ) % 65536
        out.append(u - 65536 if u >= 32768 else u)
    return out


FLAC_WRITE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("payload", T.BinaryType()),
    ]
)

FLAC_DECODE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("n_channels", T.IntegerType()),
        T.StructField("bits_per_sample", T.IntegerType()),
        T.StructField("n_samples", T.IntegerType()),
        T.StructField("sum_amp", T.LongType()),
        T.StructField("sum_sq", T.LongType()),
        T.StructField("md5_ok", T.BooleanType()),
    ]
)


def make_flac_writer(pcm_fn=None):
    """mapInPandas worker: (media_id) → (media_id, payload) with payload a
    real FLAC stream. ``pcm_fn(media_id) -> list[int]`` overrides the gate
    formula (tests feed crafted signals)."""

    def write(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib as _hashlib
        import struct as _struct

        import numpy as _np

        # Table-driven CRCs (r15): one 256-entry table per polynomial,
        # built once per task — same polynomials, same values, ~8× fewer
        # Python-level operations than the per-bit loops they replace.
        def _make_crc8_table():
            tab = []
            for byte in range(256):
                c = byte
                for _ in range(8):
                    c = ((c << 1) ^ 0x07) & 0xFF if c & 0x80 else (c << 1) & 0xFF
                tab.append(c)
            return tab

        def _make_crc16_table():
            tab = []
            for byte in range(256):
                c = byte << 8
                for _ in range(8):
                    c = ((c << 1) ^ 0x8005) & 0xFFFF if c & 0x8000 else (c << 1) & 0xFFFF
                tab.append(c)
            return tab

        _CRC8_T = _make_crc8_table()
        _CRC16_T = _make_crc16_table()

        def crc8(data: bytes) -> int:
            c = 0
            for byte in data:
                c = _CRC8_T[c ^ byte]
            return c

        def crc16(data: bytes) -> int:
            c = 0
            for byte in data:
                c = ((c << 8) & 0xFFFF) ^ _CRC16_T[(c >> 8) ^ byte]
            return c

        class BitWriter:
            def __init__(self):
                self.buf = bytearray()
                self.acc = 0
                self.nbits = 0

            def write(self, value: int, nbits: int) -> None:
                self.acc = (self.acc << nbits) | (value & ((1 << nbits) - 1))
                self.nbits += nbits
                nb = self.nbits >> 3
                if nb:
                    # flush all whole bytes at once (identical bytes to
                    # the one-at-a-time loop; r15 bulk-emission support)
                    self.nbits -= 8 * nb
                    self.buf += (self.acc >> self.nbits).to_bytes(nb, "big")
                    self.acc &= (1 << self.nbits) - 1

            def write_unary(self, q: int) -> None:
                # FLAC unary: q zero bits, then a one bit
                while q >= 32:
                    self.write(0, 32)
                    q -= 32
                self.write(1, q + 1)

            def align(self) -> None:
                if self.nbits:
                    self.write(0, 8 - self.nbits)

            def bytes(self) -> bytes:
                assert self.nbits == 0
                return bytes(self.buf)

        _sq_idx = _np.arange(FLAC_SAMPLES, dtype=_np.int64)
        _sq_term = _sq_idx * _sq_idx * _PCM_SQ

        def encode_one(mid: int) -> bytes:
            # r15 vectorization: PCM synthesis, the order-0/1/2 residual
            # magnitudes, the Rice-parameter sweep, and the residual
            # bitstream are all numpy array math now; the emitted BYTES
            # are identical (test_byte_determinism + the unchanged oracle
            # prove it), only the per-sample Python loops are gone.
            x = pcm_fn(mid) if pcm_fn is not None else None
            if x is None:
                u0 = (mid * _PCM_MUL + _sq_term) % 65536
                xa = _np.where(u0 >= 32768, u0 - 65536, u0)
            else:
                xa = _np.asarray(list(x), dtype=_np.int64)
            x = xa.tolist()
            n = len(x)
            pcm_bytes = xa.astype("<i2").tobytes()
            md5 = _hashlib.md5(pcm_bytes).digest()

            # pick FIXED order 0-2 by total residual magnitude (standard;
            # ties keep the LOWEST order, matching np.argmin's first-min)
            cands = [xa, _np.diff(xa), _np.diff(xa, n=2)]
            mags = [int(_np.abs(c).sum()) for c in cands]
            best_order = int(_np.argmin(mags))
            best_res = cands[best_order]
            # rice parameter by exhaustive bit-count minimization (first
            # minimal p wins, as before) — all 15 sweeps in one 2-D sum
            u_res = _np.where(best_res >= 0, best_res << 1, ((-best_res) << 1) - 1)
            _ps = _np.arange(15, dtype=_np.int64)
            costs = (u_res[None, :] >> _ps[:, None]).sum(axis=1) + len(u_res) * (
                1 + _ps
            )
            best_p = int(_np.argmin(costs))

            # ---- frame ----
            bw = BitWriter()
            bw.write(0b11111111111110, 14)  # sync
            bw.write(0, 1)  # reserved
            bw.write(0, 1)  # fixed-blocksize stream
            bw.write(0b0110, 4)  # blocksize: 8-bit at end (n-1)
            bw.write(0b0100, 4)  # sample rate: 8 kHz
            bw.write(0b0000, 4)  # channel assignment: mono
            bw.write(0b100, 3)  # sample size: 16 bps
            bw.write(0, 1)  # reserved
            bw.write(0x00, 8)  # UTF-8 frame number 0
            bw.write(n - 1, 8)  # blocksize-1
            bw.align()
            hdr = bw.bytes()
            bw = BitWriter()
            bw.write(crc8(hdr), 8)
            # ---- subframe (FIXED) ----
            bw.write(0, 1)  # zero pad
            bw.write(0b001000 | best_order, 6)  # FIXED + order
            bw.write(0, 1)  # no wasted bits
            for w in x[:best_order]:  # warmup, raw 16-bit signed
                bw.write(w & 0xFFFF, FLAC_BPS)
            bw.write(0b00, 2)  # residual method: 4-bit rice
            bw.write(0, 4)  # partition order 0
            bw.write(best_p, 4)  # rice parameter
            # Rice-code ALL residuals as one numpy bit array → one bulk
            # BitWriter.write (identical bit sequence to the per-residual
            # unary+binary loop: q zero bits, a one bit, then the p-bit
            # remainder, per residual in order).
            if len(u_res):
                q = (u_res >> best_p).astype(_np.int64)
                lens = q + 1 + best_p
                starts = _np.concatenate(([0], _np.cumsum(lens)[:-1]))
                total = int(lens.sum())
                bits = _np.zeros(total, dtype=_np.uint8)
                bits[starts + q] = 1
                if best_p:
                    shifts = _np.arange(best_p - 1, -1, -1, dtype=_np.int64)
                    binmat = ((u_res[:, None] >> shifts[None, :]) & 1).astype(
                        _np.uint8
                    )
                    idx = (starts + q + 1)[:, None] + _np.arange(best_p)[None, :]
                    bits[idx.ravel()] = binmat.ravel()
                packed = _np.packbits(bits)
                big = int.from_bytes(packed.tobytes(), "big") >> (
                    (8 - total % 8) % 8
                )
                bw.write(big, total)
            bw.align()
            frame_wo_crc = hdr + bw.bytes()
            frame = frame_wo_crc + _struct.pack(">H", crc16(frame_wo_crc))

            # ---- STREAMINFO ----
            si = BitWriter()
            si.write(n, 16)  # min blocksize
            si.write(n, 16)  # max blocksize
            si.write(len(frame), 24)  # min framesize
            si.write(len(frame), 24)  # max framesize
            si.write(FLAC_RATE, 20)
            si.write(0, 3)  # channels-1
            si.write(FLAC_BPS - 1, 5)
            si.write(n, 36)  # total samples
            body = si.bytes() + md5
            header = bytes([0x80]) + len(body).to_bytes(3, "big")  # last block
            return b"fLaC" + header + body + frame

        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": [int(m) for m in pdf["media_id"]],
                    "payload": [encode_one(int(m)) for m in pdf["media_id"]],
                }
            )

    return write


def make_flac_decoder():
    """mapInPandas worker: (media_id, payload) → integer-exact decode stats.

    A genuine FLAC parse: STREAMINFO walk, frame-header field/CRC-8 check,
    FIXED-subframe warmup + Rice residual decode, predictor reconstruction,
    frame CRC-16 check, and the spec's own losslessness proof — the decoded
    PCM's MD5 against STREAMINFO's stored digest (``md5_ok``)."""

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import bisect as _bisect
        import hashlib as _hashlib
        import struct as _struct

        import numpy as _np

        # Table-driven CRCs (r15): same polynomials/values as the per-bit
        # loops they replace, one table lookup per byte.
        def _make_crc8_table():
            tab = []
            for byte in range(256):
                c = byte
                for _ in range(8):
                    c = ((c << 1) ^ 0x07) & 0xFF if c & 0x80 else (c << 1) & 0xFF
                tab.append(c)
            return tab

        def _make_crc16_table():
            tab = []
            for byte in range(256):
                c = byte << 8
                for _ in range(8):
                    c = ((c << 1) ^ 0x8005) & 0xFFFF if c & 0x8000 else (c << 1) & 0xFFFF
                tab.append(c)
            return tab

        _CRC8_T = _make_crc8_table()
        _CRC16_T = _make_crc16_table()

        def crc8(data: bytes) -> int:
            c = 0
            for byte in data:
                c = _CRC8_T[c ^ byte]
            return c

        def crc16(data: bytes) -> int:
            c = 0
            for byte in data:
                c = ((c << 8) & 0xFFFF) ^ _CRC16_T[(c >> 8) ^ byte]
            return c

        class BitReader:
            """r15: the whole payload becomes ONE big integer (bit reads
            are a shift+mask instead of a per-bit Python loop) plus a
            sorted set-bit position index (unary reads are a binary
            search instead of a bit-at-a-time scan). Same bit semantics,
            same error messages on truncation/runaway."""

            def __init__(self, data: bytes, pos_bits: int = 0):
                self.data = data
                self.pos = pos_bits
                self.nbits = len(data) * 8
                self.big = int.from_bytes(data, "big")
                self.ones = _np.flatnonzero(
                    _np.unpackbits(_np.frombuffer(data, dtype=_np.uint8))
                ).tolist()

            def bits(self, n: int) -> int:
                if self.pos + n > self.nbits:
                    raise ValueError("truncated FLAC stream: bits exhausted")
                v = (self.big >> (self.nbits - self.pos - n)) & ((1 << n) - 1)
                self.pos += n
                return v

            def bit(self) -> int:
                return self.bits(1)

            def unary(self) -> int:
                i = _bisect.bisect_left(self.ones, self.pos)
                if i >= len(self.ones):
                    raise ValueError("truncated FLAC stream: bits exhausted")
                nxt = self.ones[i]
                q = nxt - self.pos
                if q > 1 << 20:
                    raise ValueError("runaway unary code")
                self.pos = nxt + 1
                return q

        def signed(v: int, nbits: int) -> int:
            return v - (1 << nbits) if v >= (1 << (nbits - 1)) else v

        def decode_one(b: bytes):
            if b[:4] != b"fLaC":
                raise ValueError("not a FLAC stream")
            # metadata walk
            pos, streaminfo = 4, None
            while True:
                hdr = b[pos]
                length = int.from_bytes(b[pos + 1 : pos + 4], "big")
                if hdr & 0x7F == 0:
                    streaminfo = b[pos + 4 : pos + 4 + length]
                pos += 4 + length
                if hdr & 0x80:
                    break
            if streaminfo is None or len(streaminfo) != 34:
                raise ValueError("missing/short STREAMINFO")
            si = BitReader(streaminfo)
            si.bits(16)  # min blocksize
            si.bits(16)  # max blocksize
            si.bits(24)  # min framesize
            si.bits(24)  # max framesize
            rate = si.bits(20)
            n_ch = si.bits(3) + 1
            bps = si.bits(5) + 1
            total = si.bits(36)
            stored_md5 = streaminfo[18:34]

            # frame header
            frame_start = pos
            br = BitReader(b, pos * 8)
            if br.bits(14) != 0b11111111111110:
                raise ValueError("bad frame sync")
            br.bit()  # reserved
            br.bit()  # blocking strategy
            bs_code = br.bits(4)
            sr_code = br.bits(4)
            ch_code = br.bits(4)
            ss_code = br.bits(3)
            br.bit()  # reserved
            first = br.bits(8)  # UTF-8 frame number (single-byte subset)
            if first >= 0x80:
                raise ValueError("multi-byte frame numbers not produced here")
            if bs_code == 0b0110:
                blocksize = br.bits(8) + 1
            elif bs_code == 0b0111:
                blocksize = br.bits(16) + 1
            elif bs_code >= 0b1000:
                blocksize = 256 << (bs_code - 8)
            elif bs_code == 0b0001:
                blocksize = 192
            elif bs_code >= 0b0010:
                blocksize = 576 << (bs_code - 2)
            else:
                raise ValueError(f"reserved blocksize code {bs_code}")
            if sr_code == 0b0100 and rate != 8000:
                raise ValueError("rate code disagrees with STREAMINFO")
            if ch_code != 0:
                raise ValueError("only mono produced here")
            if ss_code != 0b100:
                raise ValueError("only 16 bps produced here")
            hdr_end_bytes = br.pos // 8
            if crc8(b[frame_start:hdr_end_bytes]) != br.bits(8):
                raise ValueError("frame header CRC-8 mismatch")

            # subframe
            if br.bit() != 0:
                raise ValueError("subframe padding bit set")
            sf_type = br.bits(6)
            if not 0b001000 <= sf_type <= 0b001100:
                raise ValueError(f"not a FIXED subframe: {sf_type:06b}")
            order = sf_type & 0b000111
            if br.bit() != 0:
                raise ValueError("wasted bits not produced here")
            warmup = [signed(br.bits(bps), bps) for _ in range(order)]
            if br.bits(2) != 0:
                raise ValueError("only 4-bit rice partitions produced here")
            part_order = br.bits(4)
            if part_order != 0:
                raise ValueError("only partition order 0 produced here")
            p = br.bits(4)
            if p == 0b1111:
                raise ValueError("rice escape not produced here")
            # Rice residual decode in one tight local loop (r15): next
            # unary terminator via bisect over the set-bit index, the
            # p-bit remainder via one shift+mask of the payload big-int —
            # same bits, same truncation/runaway errors as the
            # method-per-bit path it replaces.
            res = []
            ones, big, nbits = br.ones, br.big, br.nbits
            pos, mask = br.pos, (1 << p) - 1
            bl_ = _bisect.bisect_left
            for _ in range(blocksize - order):
                i = bl_(ones, pos)
                if i >= len(ones):
                    raise ValueError("truncated FLAC stream: bits exhausted")
                nxt = ones[i]
                q = nxt - pos
                if q > 1 << 20:
                    raise ValueError("runaway unary code")
                pos = nxt + 1
                if p:
                    if pos + p > nbits:
                        raise ValueError("truncated FLAC stream: bits exhausted")
                    u = (q << p) | ((big >> (nbits - pos - p)) & mask)
                    pos += p
                else:
                    u = q
                res.append((u >> 1) if (u & 1) == 0 else -((u + 1) >> 1))
            br.pos = pos

            # reconstruct
            x = list(warmup)
            for r in res:
                if order == 0:
                    x.append(r)
                elif order == 1:
                    x.append(r + x[-1])
                elif order == 2:
                    x.append(r + 2 * x[-1] - x[-2])
                elif order == 3:
                    x.append(r + 3 * x[-1] - 3 * x[-2] + x[-3])
                else:
                    x.append(r + 4 * x[-1] - 6 * x[-2] + 4 * x[-3] - x[-4])

            # frame footer CRC-16 (byte-aligned)
            end = (br.pos + 7) // 8
            (crc_stored,) = _struct.unpack(">H", b[end : end + 2])
            if crc16(b[frame_start:end]) != crc_stored:
                raise ValueError("frame CRC-16 mismatch")

            xa = _np.asarray(x, dtype=_np.int64)
            if xa.size and (xa.min() < -32768 or xa.max() > 32767):
                # out-of-range reconstruction (possible only on corrupt
                # input that also passed CRC): keep the original struct
                # path so the error surface is unchanged
                pcm_bytes = b"".join(_struct.pack("<h", s) for s in x)
            else:
                pcm_bytes = xa.astype("<i2").tobytes()
            md5_ok = _hashlib.md5(pcm_bytes).digest() == stored_md5
            if total != len(x):
                raise ValueError("STREAMINFO total-samples disagrees with frame")
            return rate, n_ch, bps, x, md5_ok

        for pdf in batches:
            out: dict[str, list] = {k: [] for k in (
                "media_id", "sample_rate", "n_channels", "bits_per_sample",
                "n_samples", "sum_amp", "sum_sq", "md5_ok",
            )}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                rate, n_ch, bps, x, md5_ok = decode_one(bytes(payload))
                out["media_id"].append(int(mid))
                out["sample_rate"].append(rate)
                out["n_channels"].append(n_ch)
                out["bits_per_sample"].append(bps)
                out["n_samples"].append(len(x))
                out["sum_amp"].append(sum(x))
                out["sum_sq"].append(sum(s * s for s in x))
                out["md5_ok"].append(bool(md5_ok))
            yield pd.DataFrame(out)

    return decode


def q_multimodal_flac_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Compressed-audio ingest under the exact gate: every document id
    becomes a REAL FLAC stream (fixed predictors + Rice entropy coding +
    CRCs + PCM MD5), then a second worker decodes it back and emits
    integer-exact amplitude/energy sums plus the spec's own losslessness
    verdict. The oracle states the PCM generating formula directly —
    lossless means decode must reproduce it exactly, so any bit-level bug
    anywhere in the codec chain breaks the hash."""
    # The testdata tables are single parquet files → one input partition →
    # one codec task. Repartition the (tiny, ids-only) media frame so the
    # per-record Python codec work actually fans out across cores — the
    # ×16 scale probe measured the single-task version at 16× the wall
    # time of this one.
    media = (
        load_table(spark, sf_dir, "documents")
        .select(F.col("doc_id").alias("media_id"))
        .repartition(spark.sparkContext.defaultParallelism)
    )
    flacs = media.mapInPandas(make_flac_writer(), FLAC_WRITE_SCHEMA)
    return flacs.mapInPandas(make_flac_decoder(), FLAC_DECODE_SCHEMA)


def _sql_flac_decode() -> str:
    v = "(CASE WHEN u >= 32768 THEN u - 65536 ELSE u END)"
    return f"""
WITH s AS (
  SELECT doc_id, (doc_id * {_PCM_MUL} + p * p * {_PCM_SQ}) % 65536 AS u
  FROM documents, unnest(generate_series(0, {FLAC_SAMPLES - 1})) AS t(p)
)
SELECT doc_id AS media_id,
       {FLAC_RATE} AS sample_rate, 1 AS n_channels,
       {FLAC_BPS} AS bits_per_sample, {FLAC_SAMPLES} AS n_samples,
       CAST(SUM({v}) AS BIGINT) AS sum_amp,
       CAST(SUM({v} * {v}) AS BIGINT) AS sum_sq,
       TRUE AS md5_ok
FROM s
GROUP BY doc_id
"""


QUERIES = {
    "multimodal_flac_decode": q_multimodal_flac_decode,
}

ORACLE = {
    "multimodal_flac_decode": _sql_flac_decode(),
}
