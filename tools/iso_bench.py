"""Isolated best-of-2 timing for individual registry entries.

One FRESH process per invocation: builds the standard bench session, warms
JVM codegen (and the Structured-Streaming machinery iff a streaming entry
is requested, mirroring bench.py's pre-warm), then times each named entry
best-of-2 with cache/persistent-RDD cleanup between entries. This is the
"isolated run" recipe the r11 verdict prescribed for classifying
round-over-round movers (suite-position drag and host throttle both
disappear under isolation; a real plan regression does not).

Usage: python tools/iso_bench.py <entry> [entry ...]
Env:   SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1)
Prints one JSON line: {"sf_dir": ..., "load1": ..., "timings": {name: sec}}
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from us_flight_bigdata_dashboard_spark.registry import queries
from us_flight_bigdata_dashboard_spark.session import get_spark


def main() -> None:
    names = sys.argv[1:]
    if not names:
        raise SystemExit("usage: iso_bench.py <entry> [entry ...]")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    load1 = os.getloadavg()[0]
    qs = queries()
    spark = get_spark("iso_bench")
    spark.range(1000).selectExpr("sum(id)").collect()
    if any(n.startswith("streaming_") for n in names):
        try:
            qs["streaming_tumbling_replay"](spark, sf_dir).collect()
        except Exception:
            pass
    timings: dict[str, float] = {}
    for name in names:
        fn = qs[name]
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            fn(spark, sf_dir).collect()
            best = min(best, time.perf_counter() - t0)
        timings[name] = round(best, 4)
        spark.catalog.clearCache()
        for rdd in spark.sparkContext._jsc.getPersistentRDDs().values():
            rdd.unpersist()
    print(json.dumps({"sf_dir": sf_dir, "load1": round(load1, 2), "timings": timings}))


if __name__ == "__main__":
    main()
