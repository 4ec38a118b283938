"""Audit the ``_cum_prev`` bucket grids for skew (VERDICT r14 ask #5).

The r14 migration's value-range grid ``floor((v − min)·B/(max − min))`` is
equi-WIDTH: on a heavy-tailed order key most rows land in a few buckets and
the within-bucket window re-grows toward the single-task straggler guide
§2.5 warns about. This probe measures the REAL occupancy of every grid the
declared queries build: it monkeypatches ``statistics._bucketize`` (the one
choke point every ``_cum_prev`` call resolves at call time), builds each
registry query's DataFrame, and for every captured bucketed frame computes

  rows, distinct (group, bucket) partitions, max partition rows,
  max_share = max partition rows / group rows, ideal = 1/min(B, distinct v)

A max_share far above ideal (say > 32/1024 for a data-proportional key)
marks the call site for the ``equidepth=True`` quantile grid.

Usage: python tools/cum_skew_probe.py [entry ...]   (default: all entries)
Env:   SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1)
Prints one JSON line per captured call.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from us_flight_bigdata_dashboard_spark.operators import statistics
from us_flight_bigdata_dashboard_spark.registry import queries
from us_flight_bigdata_dashboard_spark.session import get_spark


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("cum_skew_probe")
    qs = queries()
    names = sys.argv[1:] or list(qs)

    captured: list[dict] = []
    real_bucketize = statistics._bucketize

    def probe_bucketize(df, vname, gcols, n_buckets, bucket, equidepth=False):
        out = real_bucketize(df, vname, gcols, n_buckets, bucket, equidepth)
        captured.append(
            {
                "vname": vname,
                "gcols": list(gcols),
                "n_buckets": n_buckets,
                "mode": (
                    "caller_bucket"
                    if bucket is not None
                    else ("equidepth" if equidepth else "value_range")
                ),
                "frame": out,
            }
        )
        return out

    statistics._bucketize = probe_bucketize
    try:
        for name in names:
            captured.clear()
            try:
                qs[name](spark, sf_dir)
            except Exception as e:  # builder itself failed — report, move on
                print(json.dumps({"entry": name, "error": repr(e)[:200]}))
                continue
            for i, call in enumerate(captured):
                fr = call.pop("frame")
                g = call["gcols"]
                occ = (
                    fr.groupBy(*g, "_b")
                    .agg(F.count(F.lit(1)).alias("c"))
                    .groupBy(*g)
                    .agg(
                        F.sum("c").alias("rows"),
                        F.count(F.lit(1)).alias("parts"),
                        F.max("c").alias("max_part"),
                    )
                    .agg(
                        F.sum("rows").alias("rows"),
                        F.sum("parts").alias("parts"),
                        F.max("max_part").alias("max_part"),
                        F.max(
                            F.col("max_part").cast("double") / F.col("rows")
                        ).alias("max_share"),
                    )
                    .collect()[0]
                )
                print(
                    json.dumps(
                        {
                            "entry": name,
                            "call": i,
                            **call,
                            "rows": occ["rows"],
                            "parts": occ["parts"],
                            "max_part": occ["max_part"],
                            "max_share": round(occ["max_share"], 5)
                            if occ["max_share"] is not None
                            else None,
                        }
                    )
                )
            spark.catalog.clearCache()
            for rdd in spark.sparkContext._jsc.getPersistentRDDs().values():
                rdd.unpersist()
    finally:
        statistics._bucketize = real_bucketize


if __name__ == "__main__":
    main()
