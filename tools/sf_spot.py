"""sf1 spot pass: shuffle-heavy entries against ORGANIC 10x data.

Runs each named entry at sf0.1 (baseline) and at the gen_scale.py output
(10x rows, fresh keys — real key-cardinality growth), verifying the
DuckDB oracle at BOTH sizes and reporting Spark wall-time ratios. The
K=16 probe (scale_probe.py) grows data by key-offset replication, which
preserves per-key fan-in; this pass is the complementary signal the
round-7 verdict asked for (ask #8): does the plan hold when the number
of DISTINCT customers/parts/users/docs itself grows 10x?

Usage: python tools/sf_spot.py <sf1_dir> [query ...]
Prints one JSON line per query:
  {"query": ..., "ok01": bool, "ok1": bool, "t01": s, "t1": s, "ratio": r}
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

from tools.check_oracle import canon  # same compare as the gate replica
from us_flight_bigdata_dashboard_spark.registry import oracle_sql, queries
from us_flight_bigdata_dashboard_spark.session import get_spark
from us_flight_bigdata_dashboard_spark.sources.catalog import TABLES

SF01 = "/root/testdata/sf0.1"


def run_one(spark, fn, sql, sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    t0 = time.perf_counter()
    sdf = fn(spark, sf_dir)
    srows = [tuple(r) for r in sdf.collect()]
    wall = time.perf_counter() - t0
    res = con.execute(sql)
    ocols = [d[0] for d in res.description]
    orows = res.fetchall()
    ok = (
        sorted(sdf.columns) == sorted(ocols)
        and len(srows) == len(orows)
        and canon(srows, sdf.columns) == canon(orows, ocols)
    )
    con.close()
    return ok, wall


def main() -> int:
    sf1_dir = sys.argv[1]
    names = sys.argv[2:]
    spark = get_spark("sf_spot")
    qs, oracles = queries(), oracle_sql()
    # one warm-up job so the first entry isn't charged JVM/codegen startup
    spark.range(1000).selectExpr("sum(id)").collect()
    failures = 0
    for name in names:
        fn, sql = qs[name], oracles[name]
        try:
            ok01, t01 = run_one(spark, fn, sql, SF01)
            spark.catalog.clearCache()
            for rdd in spark.sparkContext._jsc.getPersistentRDDs().values():
                rdd.unpersist()
            ok1, t1 = run_one(spark, fn, sql, sf1_dir)
            spark.catalog.clearCache()
            for rdd in spark.sparkContext._jsc.getPersistentRDDs().values():
                rdd.unpersist()
        except Exception as e:  # noqa: BLE001
            print(json.dumps({"query": name, "error": f"{type(e).__name__}: {e}"[:300]}))
            failures += 1
            continue
        if not (ok01 and ok1):
            failures += 1
        print(
            json.dumps(
                {
                    "query": name,
                    "ok01": ok01,
                    "ok1": ok1,
                    "t01": round(t01, 2),
                    "t1": round(t1, 2),
                    "ratio": round(t1 / t01, 2) if t01 > 0 else None,
                }
            ),
            flush=True,
        )
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
