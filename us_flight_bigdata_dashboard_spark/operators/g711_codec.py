"""G.711 μ-law audio in a real non-PCM RIFF/WAVE container, under the gate.

The telephony companding codec: 16-bit linear PCM → 8-bit logarithmic
μ-law (2:1 compression by segment-exponent + mantissa quantization) —
carried in a REAL .wav file with ``wFormatTag = 7`` and the ``fact``
chunk the WAVE spec REQUIRES for non-PCM formats (a PCM-only WAV parser
breaks on both, which is the point: this exercises the container's
non-PCM path, unlike the PCM16 entry in operators/multimodal.py).

Like JPEG's flat-block trick, the codec is lossy but every step is
integer arithmetic with a CLOSED FORM: decode(encode(x)) =
``((mant·8 + 132) · 2^exp) − 132`` (sign-applied) where exp/mant are the
segment/step of ``min(|x|, 32635) + 132``. The oracle states that form in
pure CASE/integer SQL (no log2 — the numeric-portability lint bans
transcendentals), so encoder bit layout, complementing, clipping, segment
search, and the decoder's expansion must all be exact for the hash to
match. Encode follows the classic Sun/CCITT reference implementation
(BIAS 0x84, CLIP 32635, complemented output byte).

The PCM generating formula sweeps the full int16 range INCLUDING the
clip region (|x| > 32635) and both signs, so every segment 0-7, the CLIP
branch, and the sign bit are all exercised by the gate data itself.

Worker helpers are NESTED closures (pickled by value; see multimodal.py).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from us_flight_bigdata_dashboard_spark.sources.catalog import load_table

G711_SAMPLES = 64
G711_RATE = 8000
_BIAS, _CLIP = 0x84, 32635

# sample(mid, i) = ((mid·37 + i·1031) mod 65536) − 32768  (full range)
_PCM_MUL, _PCM_STEP = 37, 1031


def _pcm_samples(mid: int) -> list[int]:
    return [
        ((mid * _PCM_MUL + i * _PCM_STEP) % 65536) - 32768
        for i in range(G711_SAMPLES)
    ]


def ulaw_encode(x: int) -> int:
    """Reference μ-law compressor (Sun/CCITT G.711)."""
    sign = 0x80 if x < 0 else 0x00
    if x < 0:
        x = -x
    if x > _CLIP:
        x = _CLIP
    x += _BIAS
    exp, mask = 7, 0x4000
    while exp > 0 and not (x & mask):
        exp -= 1
        mask >>= 1
    mant = (x >> (exp + 3)) & 0x0F
    return ~(sign | (exp << 4) | mant) & 0xFF


def ulaw_decode(u: int) -> int:
    """Reference μ-law expander."""
    u = ~u & 0xFF
    sign, exp, mant = u & 0x80, (u >> 4) & 0x07, u & 0x0F
    x = (((mant << 3) + _BIAS) << exp) - _BIAS
    return -x if sign else x


G711_WRITE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("payload", T.BinaryType()),
    ]
)

G711_DECODE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("n_samples", T.IntegerType()),
        T.StructField("sum_decoded", T.LongType()),
        T.StructField("sum_sq_decoded", T.LongType()),
    ]
)


def make_g711_writer(pcm_fn=None):
    """mapInPandas worker: (media_id) → real μ-law WAV bytes (RIFF/WAVE,
    fmt tag 7, fact chunk, 8-bit companded data)."""

    def write(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import struct as _struct

        BIAS, CLIP = 0x84, 32635

        def enc(x: int) -> int:
            sign = 0x80 if x < 0 else 0x00
            if x < 0:
                x = -x
            if x > CLIP:
                x = CLIP
            x += BIAS
            exp, mask = 7, 0x4000
            while exp > 0 and not (x & mask):
                exp -= 1
                mask >>= 1
            return ~(sign | (exp << 4) | ((x >> (exp + 3)) & 0x0F)) & 0xFF

        def build(mid: int) -> bytes:
            pcm = pcm_fn(mid) if pcm_fn is not None else [
                ((mid * _PCM_MUL + i * _PCM_STEP) % 65536) - 32768
                for i in range(G711_SAMPLES)
            ]
            data = bytes(enc(x) for x in pcm)
            fmt = _struct.pack(
                "<HHIIHH", 7, 1, G711_RATE, G711_RATE, 1, 8
            )  # μ-law, mono, 8 kHz, block align 1, 8 bits
            fact = _struct.pack("<I", len(data))
            body = (
                b"WAVE"
                + b"fmt " + _struct.pack("<I", len(fmt)) + fmt
                + b"fact" + _struct.pack("<I", len(fact)) + fact
                + b"data" + _struct.pack("<I", len(data)) + data
                + (b"\x00" if len(data) % 2 else b"")
            )
            return b"RIFF" + _struct.pack("<I", len(body)) + body

        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": [int(m) for m in pdf["media_id"]],
                    "payload": [build(int(m)) for m in pdf["media_id"]],
                }
            )

    return write


def make_g711_decoder():
    """mapInPandas worker: real chunk walk (fmt/fact/data by id), non-PCM
    format validation (tag 7, 8-bit, fact count == data length), μ-law
    expansion, integer-exact sums of the DECODED signal."""

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import struct as _struct

        BIAS = 0x84

        def dec(u: int) -> int:
            u = ~u & 0xFF
            sign, exp, mant = u & 0x80, (u >> 4) & 0x07, u & 0x0F
            x = (((mant << 3) + BIAS) << exp) - BIAS
            return -x if sign else x

        def decode_one(b: bytes):
            if b[:4] != b"RIFF" or b[8:12] != b"WAVE":
                raise ValueError("not a RIFF/WAVE payload")
            pos, fmt, fact_n, data = 12, None, None, None
            while pos + 8 <= len(b):
                cid = b[pos : pos + 4]
                (clen,) = _struct.unpack("<I", b[pos + 4 : pos + 8])
                body = b[pos + 8 : pos + 8 + clen]
                if cid == b"fmt ":
                    fmt = _struct.unpack("<HHIIHH", body[:16])
                elif cid == b"fact":
                    (fact_n,) = _struct.unpack("<I", body[:4])
                elif cid == b"data":
                    data = body
                pos += 8 + clen + (clen % 2)
            if fmt is None or data is None:
                raise ValueError("missing fmt/data chunk")
            tag, n_ch, rate, _br, _ba, bits = fmt
            if tag != 7:
                raise ValueError(f"wFormatTag {tag}, expected 7 (mu-law)")
            if bits != 8 or n_ch != 1:
                raise ValueError("mu-law payload must be 8-bit mono")
            if fact_n is None:
                raise ValueError("non-PCM WAV requires a fact chunk")
            if fact_n != len(data):
                raise ValueError(f"fact {fact_n} != data bytes {len(data)}")
            xs = [dec(u) for u in data]
            return rate, len(xs), sum(xs), sum(x * x for x in xs)

        for pdf in batches:
            out: dict[str, list] = {k: [] for k in (
                "media_id", "sample_rate", "n_samples",
                "sum_decoded", "sum_sq_decoded",
            )}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                # decode error boundary (fuzz-enforced)
                try:
                    rate, n, s, ss = decode_one(bytes(payload))
                except ValueError:
                    raise
                except (IndexError, KeyError, TypeError, OverflowError, _struct.error) as e:
                    raise ValueError(
                        f"corrupt mu-law WAV payload: {type(e).__name__}: {e}"
                    ) from e
                out["media_id"].append(int(mid))
                out["sample_rate"].append(rate)
                out["n_samples"].append(n)
                out["sum_decoded"].append(s)
                out["sum_sq_decoded"].append(ss)
            yield pd.DataFrame(out)

    return decode


def q_multimodal_g711_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Companded-telephony ingest under the exact gate: every document id
    becomes a real μ-law WAV (non-PCM container path); the decoder's
    expanded signal must equal the closed form of encode→decode stated by
    the oracle in pure integer CASE arithmetic — segment search, bit
    complementing, clipping, and sign handling all land in the hash."""
    media = (
        load_table(spark, sf_dir, "documents")
        .select(F.col("doc_id").alias("media_id"))
        .repartition(spark.sparkContext.defaultParallelism)
    )
    wavs = media.mapInPandas(make_g711_writer(), G711_WRITE_SCHEMA)
    return wavs.mapInPandas(make_g711_decoder(), G711_DECODE_SCHEMA)


def _sql_g711_decode() -> str:
    # exp = segment of v = min(|x|, CLIP) + BIAS: v ≥ 132 ⇒ MSB ≥ bit 7;
    # exp = MSB_position − 7 as a CASE ladder (no log2 — lint-banned).
    exp = """CASE WHEN v < 256 THEN 0 WHEN v < 512 THEN 1 WHEN v < 1024 THEN 2
             WHEN v < 2048 THEN 3 WHEN v < 4096 THEN 4 WHEN v < 8192 THEN 5
             WHEN v < 16384 THEN 6 ELSE 7 END"""
    p3 = """CASE WHEN v < 256 THEN 8 WHEN v < 512 THEN 16 WHEN v < 1024 THEN 32
            WHEN v < 2048 THEN 64 WHEN v < 4096 THEN 128 WHEN v < 8192 THEN 256
            WHEN v < 16384 THEN 512 ELSE 1024 END"""
    return f"""
WITH s AS (
  SELECT doc_id,
         ((doc_id * {_PCM_MUL} + p * {_PCM_STEP}) % 65536) - 32768 AS x
  FROM documents, unnest(generate_series(0, {G711_SAMPLES - 1})) AS t(p)
), seg AS (
  SELECT doc_id, x, LEAST(ABS(x), {_CLIP}) + {_BIAS} AS v FROM s
), d AS (
  SELECT doc_id,
         CASE WHEN x < 0 THEN -1 ELSE 1 END
           * ((((v // ({p3})) % 16) * 8 + {_BIAS}) * (({p3}) // 8) - {_BIAS})
           AS dx
  FROM seg
)
SELECT doc_id AS media_id,
       {G711_RATE} AS sample_rate,
       {G711_SAMPLES} AS n_samples,
       CAST(SUM(dx) AS BIGINT) AS sum_decoded,
       CAST(SUM(dx * dx) AS BIGINT) AS sum_sq_decoded
FROM d
GROUP BY doc_id
"""


QUERIES = {
    "multimodal_g711_decode": q_multimodal_g711_decode,
}

ORACLE = {
    "multimodal_g711_decode": _sql_g711_decode(),
}
