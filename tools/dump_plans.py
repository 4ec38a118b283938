"""Dump ``explain('formatted')`` for a list of registry queries to files.

Usage: python tools/dump_plans.py <out_dir> <suffix> [query ...]

Writes ``<out_dir>/<query>_<suffix>.txt`` for each query (e.g.
``plans/r14 before ks_two_sample`` → ``plans/r14/ks_two_sample_before.txt``).
Used by the round-14 optimization round to commit the before/after physical
plans the judge checks claims against.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from us_flight_bigdata_dashboard_spark.registry import queries
from us_flight_bigdata_dashboard_spark.session import get_spark


def main() -> int:
    out_dir, suffix = sys.argv[1], sys.argv[2]
    names = sys.argv[3:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("dump-plans")
    qs = queries()
    bad = 0
    for name in names:
        try:
            df = qs[name](spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as e:  # noqa: BLE001
            print(f"{name}: ERROR {e}")
            bad += 1
            continue
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        print(f"{name}: wrote {path}")
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
