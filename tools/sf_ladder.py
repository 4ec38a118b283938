"""Three-point organic scale ladder with best-of-2 timing per point.

``sf_spot.py`` gives one organic scale point (sf0.1 → sf1) with single-run
timings; round-9 measurement showed single runs on a shared box carry up to
±2× noise at these sizes (xyz_demand_class read 46 s and 13 s in two
single-run passes), which is enough to misclassify a slope. This tool is
the instrument the round-8 verdict asked for (ask #3): THREE scale points
(sf0.1, an organic ×10 dir, an organic ×20 dir — build them with
``gen_scale.py <dir> 10|20``), best-of-2 wall per point, all in one warm
session, and a slope verdict from the sf1→sf2 DOUBLING ratio:

  ~2.0  linear        (work tracks data)
  ~1.0  sublinear     (fixed costs or a binding cap dominate)
  ~4.0  quadratic     (a pair/group term grows with the square — fix it)

The doubling ratio is the discriminator because the sf0.1→sf1 step
conflates parallel-slack absorption with real growth on a 32-thread box.

Usage: python tools/sf_ladder.py <sf1_dir> <sf2_dir> [query ...]
Prints one JSON line per query with the three best-of-2 walls and both
ratios. Timing only — run the oracle gate (check_oracle.py / sf_spot.py)
separately for correctness at scale.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from us_flight_bigdata_dashboard_spark.registry import queries
from us_flight_bigdata_dashboard_spark.session import get_spark

SF01 = "/root/testdata/sf0.1"


def main() -> int:
    sf1_dir, sf2_dir = sys.argv[1], sys.argv[2]
    names = sys.argv[3:]
    spark = get_spark("sf_ladder")
    spark.range(1000).selectExpr("sum(id)").collect()
    qs = queries()
    for name in names:
        fn = qs[name]
        row: dict[str, float] = {}
        for lbl, d in (("sf0.1", SF01), ("sf1", sf1_dir), ("sf2", sf2_dir)):
            best = float("inf")
            for _ in range(2):
                t0 = time.perf_counter()
                fn(spark, d).collect()
                best = min(best, time.perf_counter() - t0)
                spark.catalog.clearCache()
                for rdd in spark.sparkContext._jsc.getPersistentRDDs().values():
                    rdd.unpersist()
            row[lbl] = round(best, 2)
        print(
            json.dumps(
                {
                    "query": name,
                    **row,
                    "ratio_01_to_1": round(row["sf1"] / row["sf0.1"], 2),
                    "ratio_1_to_2": round(row["sf2"] / row["sf1"], 2),
                }
            ),
            flush=True,
        )
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
