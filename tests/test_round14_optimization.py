"""Round-14 optimization round: ``statistics._cum_prev`` — the shared
bucketed cumulative/rank decomposition that replaced every data-proportional
unpartitioned window — proven value-identical to the plain window it
replaced, directly against Spark's own window results on adversarial
synthetic frames (heavy ties, skewed values, negative keys, groups, string
bucket override). The per-entry proof is the unchanged DuckDB oracle; this
is the unit-level proof of the helper itself.
"""

from __future__ import annotations

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from us_flight_bigdata_dashboard_spark.operators.statistics import _cum_prev


def _reference_prev(spark, rows, order_cols, group_cols=()):
    df = spark.createDataFrame(rows, "g INT, v LONG, k INT, c LONG")
    w = (
        Window.partitionBy(*group_cols) if group_cols else Window.partitionBy(F.lit(0))
    ).orderBy(*order_cols).rowsBetween(Window.unboundedPreceding, -1)
    return df.select(
        "g", "v", "k", "c", F.coalesce(F.sum("c").over(w), F.lit(0)).alias("t")
    )


def _rows():
    # skewed values (cluster at 0, one far outlier), heavy ties on v,
    # negatives, two groups
    rows = []
    i = 0
    for g in (1, 2):
        for v, reps in ((-5, 3), (0, 7), (1, 4), (2, 1), (1000, 2), (7, 5)):
            for _ in range(reps):
                rows.append((g, v, i, (i % 5) + 1))
                i += 1
    return rows


def _canon(df):
    return sorted(tuple(r) for r in df.collect())


def test_cum_prev_matches_plain_window_global(spark):
    rows = _rows()
    df = spark.createDataFrame(rows, "g INT, v LONG, k INT, c LONG")
    got = _cum_prev(df, ["v", "k"], {"t": F.col("c")}).select(
        "g", "v", "k", "c", "t"
    )
    want = _reference_prev(spark, rows, ["v", "k"])
    assert _canon(got) == _canon(want)


def test_cum_prev_matches_plain_window_grouped(spark):
    rows = _rows()
    df = spark.createDataFrame(rows, "g INT, v LONG, k INT, c LONG")
    got = _cum_prev(
        df, ["v", "k"], {"t": F.col("c")}, group_cols=["g"]
    ).select("g", "v", "k", "c", "t")
    want = _reference_prev(spark, rows, ["v", "k"], group_cols=["g"])
    assert _canon(got) == _canon(want)


def test_cum_prev_rank_matches_row_number(spark):
    rows = _rows()
    df = spark.createDataFrame(rows, "g INT, v LONG, k INT, c LONG")
    got = _cum_prev(df, ["v", "k"], {"_rp": F.lit(1)}).select(
        "k", (F.col("_rp") + F.lit(1)).alias("rn")
    )
    w = Window.partitionBy(F.lit(0)).orderBy("v", "k")
    want = df.select("k", F.row_number().over(w).cast("long").alias("rn"))
    assert _canon(got) == _canon(want)


def test_cum_prev_constant_column_single_bucket(spark):
    # min == max → every row lands in one bucket; order falls back to the
    # tie-break key and the decomposition still reproduces the window
    rows = [(1, 42, i, (i % 3) + 1) for i in range(10)]
    df = spark.createDataFrame(rows, "g INT, v LONG, k INT, c LONG")
    got = _cum_prev(df, ["v", "k"], {"t": F.col("c")}).select("k", "t")
    w = Window.partitionBy(F.lit(0)).orderBy("v", "k").rowsBetween(
        Window.unboundedPreceding, -1
    )
    want = df.select("k", F.coalesce(F.sum("c").over(w), F.lit(0)).alias("t"))
    assert _canon(got) == _canon(want)


def test_cum_prev_fewer_rows_than_buckets(spark):
    rows = [(1, v, v, 1) for v in (3, 1, 2)]
    df = spark.createDataFrame(rows, "g INT, v LONG, k INT, c LONG")
    got = _cum_prev(df, ["v"], {"t": F.col("c")}).select("v", "t")
    assert _canon(got) == [(1, 0), (2, 1), (3, 2)]


def test_cum_prev_explicit_bucket_hex_prefix(spark):
    # the sdr_variance/fs_record_linkage path: a caller-supplied bucket id
    # monotone in a STRING order key
    import hashlib

    rows = [(hashlib.md5(str(i).encode()).hexdigest(), i) for i in range(200)]
    df = spark.createDataFrame(rows, "h STRING, k LONG")
    hb = F.conv(F.substring(F.col("h"), 1, 3), 16, 10)
    got = _cum_prev(df, ["h", "k"], {"_rp": F.lit(1)}, bucket=hb).select(
        "k", (F.col("_rp") + F.lit(1)).alias("rn")
    )
    w = Window.partitionBy(F.lit(0)).orderBy("h", "k")
    want = df.select("k", F.row_number().over(w).cast("long").alias("rn"))
    assert _canon(got) == _canon(want)


def test_cum_prev_decimal_sums_exact(spark):
    # the lorenz/abc shape: exact decimal running sums decompose exactly
    rows = [(1, (i * 7919) % 1000, i, 1) for i in range(300)]
    df = spark.createDataFrame(rows, "g INT, v LONG, k INT, c LONG").withColumn(
        "x", (F.col("v") * 100000 + 7).cast("decimal(19,0)")
    )
    got = _cum_prev(df, ["v", "k"], {"cx": F.col("x")}).select("k", "cx")
    w = Window.partitionBy(F.lit(0)).orderBy("v", "k").rowsBetween(
        Window.unboundedPreceding, -1
    )
    want = df.select(
        "k", F.coalesce(F.sum("x").over(w), F.lit(0)).alias("cx")
    )
    assert _canon(got) == _canon(want)


@pytest.mark.parametrize("n,k", [(10, 5), (13, 5), (4, 5), (101, 10)])
def test_ntile_closed_form_matches_spark_ntile(spark, n, k):
    # the rfm/histogram_equifreq/activity_concentration closed form:
    # ntile(k) over n rows == first (n mod k) tiles hold (n div k)+1 rows
    rows = [(i, (i * 31) % 97) for i in range(n)]
    df = spark.createDataFrame(rows, "id LONG, v LONG")
    w = Window.partitionBy(F.lit(0)).orderBy("v", "id")
    want = df.select("id", F.ntile(k).over(w).alias("tile"))
    rn = F.row_number().over(w).cast("long")
    nn = F.lit(n).cast("long")
    q = F.floor(nn / F.lit(k)).cast("long")
    r = nn % F.lit(k)
    big = r * (q + F.lit(1))
    tile = (
        F.when(rn <= big, F.floor((rn - 1) / (q + F.lit(1))))
        .otherwise(r + F.floor((rn - big - F.lit(1)) / q))
        + F.lit(1)
    ).cast("int")
    got = df.select("id", tile.alias("tile"))
    assert _canon(got) == _canon(want)
