"""Round-15 optimization round: unit proofs for the two ``_cum_prev``
upgrades (``with_totals`` — group totals derived from the offset table with
no extra input pass — and ``equidepth`` — the approx-quantile bucket grid
that closes the value-range grid's skew hole, VERDICT r14 ask #5), plus the
adversarial Zipf occupancy bound the verdict asked for.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from us_flight_bigdata_dashboard_spark.operators.statistics import (
    _bucketize,
    _cum_prev,
    _rank_prev_tied,
)


def _zipf_rows(n=4096):
    """Zipf-ish DISTINCT order keys: value density ~1/rank, so a value-range
    grid drops almost every row into the first few buckets (the r14 skew
    hole), while an equi-depth grid spreads them ~uniformly. One row per
    distinct value (the shape every rank-test caller feeds: the per-value
    aggregated frame); exact integer addends."""
    rows = []
    for i in range(1, n + 1):
        # harmonic-ish spacing: many tiny values, a long sparse tail
        v = (i * i * i) // 64  # cubic growth → heavy head density at 0
        rows.append((v, i, (i % 7) + 1))
    return rows


def _canon(df):
    return sorted(tuple(r) for r in df.collect())


def test_cum_prev_equidepth_matches_plain_window(spark):
    rows = _zipf_rows(512)
    df = spark.createDataFrame(rows, "v LONG, k INT, c LONG")
    got = _cum_prev(
        df, ["v", "k"], {"t": F.col("c")}, n_buckets=64, equidepth=True
    ).select("v", "k", "c", "t")
    w = Window.partitionBy(F.lit(0)).orderBy("v", "k").rowsBetween(
        Window.unboundedPreceding, -1
    )
    want = df.select(
        "v", "k", "c", F.coalesce(F.sum("c").over(w), F.lit(0)).alias("t")
    )
    assert _canon(got) == _canon(want)


def test_equidepth_bounds_zipf_bucket_occupancy(spark):
    """The adversarial case from VERDICT r14 ask #5: on a heavy-headed key
    the value-range grid concentrates most rows in a few buckets (the
    within-bucket window re-grows toward a single-task straggler), while
    the equi-depth grid keeps every bucket's share bounded."""
    n, b = 4096, 256
    df = spark.createDataFrame(_zipf_rows(n), "v LONG, k INT, c LONG")

    def max_share(bucketed):
        counts = [r["c"] for r in bucketed.groupBy("_b").count().withColumnRenamed("count", "c").collect()]
        return max(counts) / n

    range_share = max_share(_bucketize(df, "v", [], b, None))
    depth_share = max_share(_bucketize(df, "v", [], b, None, equidepth=True))
    # cubic value growth: ~87% of the range's low end holds >95% of rows
    assert range_share > 0.10, f"skew fixture too tame: {range_share}"
    # equi-depth: ideal share is 1/256; allow 4x sketch slack
    assert depth_share <= 4 / b, f"equidepth failed to bound share: {depth_share}"


def test_cum_prev_with_totals_matches_count_and_window(spark):
    rows = _zipf_rows(300)
    df = spark.createDataFrame(rows, "v LONG, k INT, c LONG")
    out = _cum_prev(df, ["v", "k"], {"t": F.col("c")}, with_totals=True)
    grand = df.agg(F.sum("c")).collect()[0][0]
    tots = {r["t_tot"] for r in out.select("t_tot").distinct().collect()}
    assert tots == {grand}
    # and the cumulative column itself is still the exact exclusive prefix
    w = Window.partitionBy(F.lit(0)).orderBy("v", "k").rowsBetween(
        Window.unboundedPreceding, -1
    )
    want = df.select(
        "v", "k", "c", F.coalesce(F.sum("c").over(w), F.lit(0)).alias("t")
    )
    assert _canon(out.select("v", "k", "c", "t")) == _canon(want)


def test_rank_prev_tied_matches_plain_window(spark):
    """Tie-heavy key (3 distinct values over 600 rows — the class the r15
    skew audit found live in rfm/hosmer/activity_concentration): the
    two-level tie decomposition must equal the plain-window exclusive
    rank over (v, k) exactly, and with_totals must equal the row count."""
    rows = [(v, k) for k in range(200) for v in (1, 1, 5)][:600]
    rows = [(v, i) for i, (v, _) in enumerate(rows)]
    df = spark.createDataFrame(rows, "v LONG, k INT")
    got = _rank_prev_tied(df, "v", ["k"], "r", n_buckets=16, with_totals=True)
    w = Window.partitionBy(F.lit(0)).orderBy("v", "k").rowsBetween(
        Window.unboundedPreceding, -1
    )
    want = df.select("v", "k", F.coalesce(F.sum(F.lit(1)).over(w), F.lit(0)).alias("r"))
    assert _canon(got.select("v", "k", "r")) == _canon(want)
    assert {r["r_tot"] for r in got.select("r_tot").distinct().collect()} == {600}


def test_rank_prev_tied_grouped(spark):
    rows = [(g, v, k) for g in (1, 2) for k in range(30) for v in (7, 7, 7, 9)]
    rows = [(g, v, i) for i, (g, v, _) in enumerate(rows)]
    df = spark.createDataFrame(rows, "g INT, v LONG, k INT")
    got = _rank_prev_tied(
        df, "v", ["k"], "r", group_cols=["g"], n_buckets=8, with_totals=True
    )
    w = Window.partitionBy("g").orderBy("v", "k").rowsBetween(
        Window.unboundedPreceding, -1
    )
    want = df.select(
        "g", "v", "k", F.coalesce(F.sum(F.lit(1)).over(w), F.lit(0)).alias("r")
    )
    assert _canon(got.select("g", "v", "k", "r")) == _canon(want)
    per_g = {r["g"]: r["c"] for r in df.groupBy("g").agg(F.count(F.lit(1)).alias("c")).collect()}
    for r in got.select("g", "r_tot").distinct().collect():
        assert r["r_tot"] == per_g[r["g"]]


def test_cum_prev_with_totals_grouped(spark):
    rows = [(g, v, k, v + k) for g in (1, 2) for k, v in enumerate((5, 5, 7, 9, 9, 12))]
    df = spark.createDataFrame(rows, "g INT, v LONG, k INT, c LONG")
    out = _cum_prev(
        df, ["v", "k"], {"t": F.col("c")}, group_cols=["g"], with_totals=True
    )
    per_g = {r["g"]: r["s"] for r in df.groupBy("g").agg(F.sum("c").alias("s")).collect()}
    for r in out.select("g", "t_tot").distinct().collect():
        assert r["t_tot"] == per_g[r["g"]]
