"""Deterministic ORGANIC scale-up generator for the testdata schema.

``scale_probe.py`` grows data by replicating sf0.1 with key offsets —
cheap, but every dimension key keeps its sf0.1 fan-in pattern and no NEW
entities appear. This tool instead synthesizes tables at an arbitrary
multiple of the sf0.1 shape with FRESH keys drawn hash-deterministically
(xxhash64 on the row id — no RNG, identical output on any partitioning),
so key cardinalities, join fan-ins, and group counts grow the way a
bigger real dataset grows. That is what the sf1 spot pass (VERDICT r7
ask #8) needs: shuffle-heavy plans exercised against genuine
key-cardinality growth, not replica skew.

Marginals mirror the driver testdata (measured at sf0.1): same column
domains (priority/status/segment/brand/type vocabularies, the 30-word
document vocabulary, 8×8 part names, unit-normalized label-clustered
64-dim embeddings, 30-day monotone event stream), same row-count ratios
(orders = customers×10, lineitem = orders×4, 1.5k users per 100k events).
``o_orderdate`` is a pure hash function of the order key, so lineitem
re-derives its ship date from ``l_orderkey`` without a join, exactly like
a generator pipeline would at 100 TB (fully parallel, zero shuffles).

Usage: python tools/gen_scale.py <out_dir> [multiplier-vs-sf0.1 = 10]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

SF01 = "/root/testdata/sf0.1"

EPOCH_1995 = 788918400  # 1995-01-01 UTC
ORDER_DAYS = 2404       # ..2001-08-01
EPOCH_2024 = 1704067200  # 2024-01-01 UTC
EVENT_SPAN = 30 * 86400

SEGMENTS = ["MACHINERY", "FURNITURE", "AUTOMOBILE", "BUILDING", "HOUSEHOLD"]
PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
STATUSES = ["O", "P", "F"]
ADJ = ["blue", "cold", "hot", "large", "new", "old", "red", "small"]
NOUN = ["anvil", "bolt", "gear", "gizmo", "plate", "ring", "rod", "widget"]
PTYPES = ["ECONOMY", "LARGE", "STANDARD", "PROMO", "MEDIUM", "SMALL"]
EVENT_TYPES = ["view", "click", "purchase", "signup", "error"]
LANGS = ["en", "zh", "fr", "es", "de"]
VOCAB = [
    "spark", "window", "merge", "table", "column", "vector", "stream",
    "value", "data", "small", "join", "filter", "big", "group", "hash",
    "customer", "sort", "order", "slow", "line", "part", "fast", "row",
    "the", "agg", "key", "query", "a", "scan", "batch",
]
EMB_DIM = 64


def _h(salt: int, *cols):
    return F.xxhash64(*cols, F.lit(salt))


def _pm(salt: int, mod: int, *cols):
    return F.pmod(_h(salt, *cols), F.lit(mod))


def _pick(arr: list[str], salt: int, *cols):
    return F.element_at(
        F.array(*[F.lit(x) for x in arr]), (_pm(salt, len(arr), *cols) + 1).cast("int")
    )


def _cents(salt: int, lo: float, hi: float, *cols):
    span = int(round((hi - lo) * 100))
    return F.round(F.lit(lo) + _pm(salt, span + 1, *cols) / 100.0, 2)


def _ids(spark: SparkSession, n: int, name: str) -> DataFrame:
    parts = max(spark.sparkContext.defaultParallelism, 8)
    return spark.range(0, n, 1, parts).withColumnRenamed("id", name)


def gen_all(spark: SparkSession, out: str, mult: float = 10.0) -> None:
    n_cust = int(15_000 * mult)
    n_supp = int(1_000 * mult)
    n_part = int(20_000 * mult)
    n_orders = int(150_000 * mult)
    n_line = int(600_000 * mult)
    n_events = int(100_000 * mult)
    n_users = int(1_500 * mult)
    n_docs = int(5_000 * mult)
    n_vecs = int(2_000 * mult)

    os.makedirs(out, exist_ok=True)

    def w(df: DataFrame, name: str) -> None:
        # single FILE per table, like the driver testdata (the DuckDB
        # oracle views read '<dir>/<t>.parquet' as one file; Spark scan
        # parallelism is preserved by row-group splitting)
        import glob
        import shutil

        tmp = os.path.join(out, f"_{name}_dir")
        df.coalesce(1).write.mode("overwrite").parquet(tmp)
        (part,) = glob.glob(os.path.join(tmp, "part-*.parquet"))
        shutil.move(part, os.path.join(out, f"{name}.parquet"))
        shutil.rmtree(tmp, ignore_errors=True)

    # static dims are the real ones (5 regions / 25 nations never grow)
    for t in ("region", "nation"):
        w(spark.read.parquet(os.path.join(SF01, f"{t}.parquet")), t)

    k = F.col("c_custkey")
    w(
        _ids(spark, n_cust, "c_custkey").select(
            k,
            F.concat(F.lit("Customer#"), F.lpad(k.cast("string"), 9, "0")).alias("c_name"),
            _pm(11, 25, k).cast("int").alias("c_nationkey"),
            _cents(12, -999.99, 9999.99, k).alias("c_acctbal"),
            _pick(SEGMENTS, 13, k).alias("c_mktsegment"),
        ),
        "customer",
    )

    k = F.col("s_suppkey")
    w(
        _ids(spark, n_supp, "s_suppkey").select(
            k,
            F.concat(F.lit("Supplier#"), F.lpad(k.cast("string"), 9, "0")).alias("s_name"),
            _pm(21, 25, k).cast("int").alias("s_nationkey"),
            _cents(22, -999.99, 9999.99, k).alias("s_acctbal"),
        ),
        "supplier",
    )

    k = F.col("p_partkey")
    w(
        _ids(spark, n_part, "p_partkey").select(
            k,
            F.concat(_pick(ADJ, 31, k), F.lit(" "), _pick(NOUN, 32, k)).alias("p_name"),
            F.concat(F.lit("Brand#"), (_pm(33, 25, k) + 1).cast("string")).alias("p_brand"),
            _pick(PTYPES, 34, k).alias("p_type"),
            (_pm(35, 50, k) + 1).cast("int").alias("p_size"),
            F.round(F.lit(900.0) + k / 10.0, 2).alias("p_retailprice"),
        ),
        "part",
    )

    def odate(key):
        return F.timestamp_seconds(
            F.lit(EPOCH_1995) + _pm(41, ORDER_DAYS, key) * F.lit(86400)
        )

    k = F.col("o_orderkey")
    w(
        _ids(spark, n_orders, "o_orderkey").select(
            k,
            _pm(42, n_cust, k).alias("o_custkey"),
            _pick(STATUSES, 43, k).alias("o_orderstatus"),
            _cents(44, 1001.0, 499999.99, k).alias("o_totalprice"),
            odate(k).alias("o_orderdate"),
            _pick(PRIORITIES, 45, k).alias("o_orderpriority"),
        ),
        "orders",
    )

    lid = F.col("_lid")
    okey = _pm(51, n_orders, lid)
    qty = (_pm(52, 50, lid) + 1).cast("double")
    unit = F.lit(900.0) + _pm(53, 120001, lid) / 100.0
    w(
        _ids(spark, n_line, "_lid").select(
            okey.alias("l_orderkey"),
            _pm(54, n_part, lid).alias("l_partkey"),
            _pm(55, n_supp, lid).alias("l_suppkey"),
            (_pm(56, 7, lid) + 1).cast("int").alias("l_linenumber"),
            qty.alias("l_quantity"),
            F.round(qty * unit, 2).alias("l_extendedprice"),
            (_pm(57, 11, lid) / 100.0).alias("l_discount"),
            (_pm(58, 9, lid) / 100.0).alias("l_tax"),
            _pick(["N", "A", "R"], 59, lid).alias("l_returnflag"),
            _pick(["O", "F"], 60, lid).alias("l_linestatus"),
            # ship 1..95 days after the (hash-derived) order date — no join
            F.timestamp_seconds(
                F.lit(EPOCH_1995)
                + _pm(41, ORDER_DAYS, okey) * F.lit(86400)
                + (_pm(61, 95, lid) + 1) * F.lit(86400)
            ).alias("l_shipdate"),
        ),
        "lineitem",
    )

    k = F.col("event_id")
    step_us = EVENT_SPAN * 1_000_000 // n_events
    w(
        _ids(spark, n_events, "event_id").select(
            k,
            F.timestamp_micros(
                F.lit(EPOCH_2024 * 1_000_000)
                + k * F.lit(step_us)
                + _pm(71, max(step_us - 1, 1), k)
            ).alias("ts"),
            _pm(72, n_users, k).alias("user_id"),
            _pick(EVENT_TYPES, 73, k).alias("event_type"),
            (_pm(74, 56022, k) / 100.0).alias("value"),
            F.concat(F.lit('{"k": '), _pm(75, 100, k).cast("string"), F.lit("}")).alias(
                "props"
            ),
        ),
        "events",
    )

    k = F.col("doc_id")
    n_words = _pm(81, 51, k) + 10
    words = F.transform(
        F.sequence(F.lit(1), n_words.cast("int")),
        lambda i: F.element_at(
            F.array(*[F.lit(x) for x in VOCAB]),
            (F.pmod(F.xxhash64(k, i, F.lit(82)), F.lit(len(VOCAB))) + 1).cast("int"),
        ),
    )
    lang = F.when(_pm(83, 20, k) < 8, F.lit("en")).otherwise(
        _pick(LANGS[1:], 84, k)
    )
    w(
        _ids(spark, n_docs, "doc_id")
        .select(
            k,
            F.array_join(words, " ").alias("text"),
            lang.alias("lang"),
            F.concat(F.lit("src"), _pm(85, 20, k).cast("string")).alias("source"),
        )
        .withColumn("n_chars", F.length("text").cast("long")),
        "documents",
    )

    k = F.col("vec_id")
    label = _pm(91, 10, k)
    # label-clustered unit vectors: 0.7·center(label) + 0.3·noise(vec),
    # components uniform in [-1, 1], then L2-normalized
    raw = F.transform(
        F.sequence(F.lit(1), F.lit(EMB_DIM)),
        lambda i: 0.7
        * ((F.pmod(F.xxhash64(label, i, F.lit(92)), F.lit(20001)) - 10000) / 10000.0)
        + 0.3
        * ((F.pmod(F.xxhash64(k, i, F.lit(93)), F.lit(20001)) - 10000) / 10000.0),
    )
    norm = F.sqrt(
        F.aggregate(raw, F.lit(0.0), lambda acc, x: acc + x * x)
    )
    w(
        _ids(spark, n_vecs, "vec_id").select(
            k,
            F.transform(raw, lambda x: (x / norm).cast("float")).alias("embedding"),
            label.cast("int").alias("label"),
        ),
        "embeddings",
    )


def main() -> None:
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sfscale/sf1"
    mult = float(sys.argv[2]) if len(sys.argv) > 2 else 10.0
    from us_flight_bigdata_dashboard_spark.session import get_spark

    spark = get_spark("gen_scale")
    gen_all(spark, out, mult)
    print(f"generated multiplier={mult} at {out}")


if __name__ == "__main__":
    main()
