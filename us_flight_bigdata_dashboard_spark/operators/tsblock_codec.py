"""Delta-of-delta timestamp block codec — time-series storage compression.

The sixth compression family on real bytes (after DCT+Huffman, DEFLATE,
Rice, LZW, and companding): the Gorilla/Prometheus-style TIMESTAMP trick.
Event streams are near-regular, so second differences of sorted
timestamps concentrate near zero; zigzag + varint coding then stores most
deltas in 1-2 bytes instead of 8. This is how every serious TSDB lays
out its time axis, and the shape a 100 TB event archive wants per
(key, time-chunk) block.

Per user (``applyInPandas`` — one block per key, the TSDB layout), the
worker sorts timestamps, encodes ``[varint n][varint ts0][zigzag-varint
Δ₁][zigzag-varint ΔΔ₂…]`` into real bytes, then DECODES the block back
and verifies the roundtrip sample-for-sample before emitting the
receipt row (count, sum/min/max of the DECODED microseconds, encoded
bytes). Losslessness makes the oracle the events table itself: any
varint/zigzag/reconstruction bug changes the decoded values and breaks
the hash. The encoded size is also gate-checked — the coding is
deterministic, and the oracle mirrors the varint length arithmetic in
pure integer SQL (byte count = Σ ⌈bits/7⌉), so the COMPRESSION itself is
verified cross-engine, not just the transport.

Worker helpers are NESTED closures (pickled by value; see multimodal.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from us_flight_bigdata_dashboard_spark.sources.catalog import load_table

TSBLOCK_SCHEMA = (
    "user_id bigint, n_events bigint, sum_ts_us bigint, "
    "min_ts_us bigint, max_ts_us bigint, enc_bytes bigint"
)


def make_tsblock_worker():
    """applyInPandas worker: one user's events → encode → decode →
    verified receipt row."""

    def work(pdf):
        import pandas as pd

        def uvarint(v: int) -> bytes:
            out = bytearray()
            while True:
                b = v & 0x7F
                v >>= 7
                if v:
                    out.append(b | 0x80)
                else:
                    out.append(b)
                    return bytes(out)

        def zigzag(v: int) -> int:
            return (v << 1) ^ (v >> 63) if v >= 0 else ((-v) << 1) - 1

        def read_uvarint(b: bytes, pos: int):
            v = shift = 0
            while True:
                byte = b[pos]
                pos += 1
                v |= (byte & 0x7F) << shift
                if not byte & 0x80:
                    return v, pos
                shift += 7

        def unzigzag(u: int) -> int:
            return (u >> 1) if (u & 1) == 0 else -((u + 1) >> 1)

        ts = sorted(int(t) for t in pdf["ts_us"])
        n = len(ts)
        enc = bytearray(uvarint(n))
        prev, prev_delta = 0, 0
        for i, t in enumerate(ts):
            if i == 0:
                enc += uvarint(t)
            elif i == 1:
                prev_delta = t - prev
                enc += uvarint(zigzag(prev_delta))
            else:
                delta = t - prev
                enc += uvarint(zigzag(delta - prev_delta))
                prev_delta = delta
            prev = t
        blob = bytes(enc)

        # decode back and verify — the roundtrip is part of the operator,
        # so the receipt provably describes DECODED data
        got, pos = [], 0
        m, pos = read_uvarint(blob, pos)
        prev, prev_delta = 0, 0
        for i in range(m):
            u, pos = read_uvarint(blob, pos)
            if i == 0:
                t = u
            elif i == 1:
                prev_delta = unzigzag(u)
                t = prev + prev_delta
            else:
                prev_delta = prev_delta + unzigzag(u)
                t = prev + prev_delta
            got.append(t)
            prev = t
        if pos != len(blob) or got != ts:
            raise ValueError("tsblock roundtrip mismatch")

        return pd.DataFrame(
            {
                "user_id": [int(pdf["user_id"].iloc[0])],
                "n_events": [n],
                "sum_ts_us": [sum(ts)],
                "min_ts_us": [ts[0]],
                "max_ts_us": [ts[-1]],
                "enc_bytes": [len(blob)],
            }
        )

    return work


def q_tsblock_compress(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user timestamp block compression under the exact gate: encode →
    decode → receipt (count, sum/min/max of decoded microseconds, encoded
    byte size). The oracle recomputes the receipt INCLUDING the varint
    byte count from the raw events table, so both the losslessness and
    the compression arithmetic are verified cross-engine."""
    events = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("ts").isNotNull())
        .select(
            "user_id",
            (F.unix_micros(F.col("ts").cast("timestamp"))).alias("ts_us"),
        )
    )
    return (
        events.groupBy("user_id")
        .applyInPandas(make_tsblock_worker(), TSBLOCK_SCHEMA)
        .orderBy("user_id")
    )


def _sql_tsblock() -> str:
    # varint length of unsigned v = max(1, ceil(bit_length(v)/7)); DuckDB
    # has bit_length-free paths via log-free CASE? Use length in bits via
    # a 10-step CASE over 7-bit thresholds (ts_us < 2^56 always here).
    def vlen(expr: str) -> str:
        return (
            f"(CASE WHEN {expr} < 128 THEN 1 WHEN {expr} < 16384 THEN 2 "
            f"WHEN {expr} < 2097152 THEN 3 WHEN {expr} < 268435456 THEN 4 "
            f"WHEN {expr} < 34359738368 THEN 5 WHEN {expr} < 4398046511104 THEN 6 "
            f"WHEN {expr} < 562949953421312 THEN 7 "
            f"WHEN {expr} < 72057594037927936 THEN 8 ELSE 9 END)"
        )

    zz = "CASE WHEN dd >= 0 THEN dd * 2 ELSE (-dd) * 2 - 1 END"
    return f"""
WITH e AS (
  SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us
  FROM events WHERE ts IS NOT NULL
), o AS (
  SELECT user_id, ts_us,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts_us) AS rn,
         ts_us - LAG(ts_us) OVER (PARTITION BY user_id ORDER BY ts_us) AS delta
  FROM e
), dd AS (
  SELECT user_id, ts_us, rn,
         CASE WHEN rn = 1 THEN NULL
              WHEN rn = 2 THEN delta
              ELSE delta - LAG(delta) OVER (PARTITION BY user_id ORDER BY rn)
         END AS dd
  FROM o
), sized AS (
  SELECT user_id, ts_us,
         CASE WHEN rn = 1 THEN {vlen("ts_us")}
              ELSE {vlen(zz)} END AS member_bytes
  FROM dd
)
SELECT user_id,
       COUNT(*) AS n_events,
       CAST(SUM(ts_us) AS BIGINT) AS sum_ts_us,
       MIN(ts_us) AS min_ts_us,
       MAX(ts_us) AS max_ts_us,
       CAST({vlen("COUNT(*)")} + SUM(member_bytes) AS BIGINT) AS enc_bytes
FROM sized
GROUP BY user_id
ORDER BY user_id
"""


QUERIES = {
    "tsblock_compress": q_tsblock_compress,
}

ORACLE = {
    "tsblock_compress": _sql_tsblock(),
}
