"""Physical-plan audit across the whole query registry.

Walks every ``queries()`` entry, renders the executed plan, and reports the
operators that matter at 100 TB: shuffle exchanges, broadcasts, sort-merge
joins, and the anti-pattern nodes that should never appear (CartesianProduct
without a bounded side, row-at-a-time BatchEvalPython). Exit 1 if a hard
anti-pattern shows up so this can run as a gate.

Usage: python tools/plan_audit.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from us_flight_bigdata_dashboard_spark.registry import queries
from us_flight_bigdata_dashboard_spark.session import get_spark

# mapInPandas/applyInPandas are Arrow-batched (allowed); BatchEvalPython is
# the row-at-a-time pickler (never allowed in this engine)
HARD_BAD = ["BatchEvalPython"]
# cartesian joins are allowed only where one side is provably tiny (the
# audit prints them for eyeball review rather than failing)
SOFT_FLAG = ["CartesianProduct", "BroadcastNestedLoopJoin"]


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("plan-audit")
    bad = 0
    rows = []
    for name, fn in sorted(queries().items()):
        try:
            plan = fn(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
        except Exception as e:  # noqa: BLE001
            print(f"{name}: PLAN ERROR {e}")
            bad += 1
            continue
        shuffles = plan.count("Exchange hashpartitioning") + plan.count(
            "Exchange rangepartitioning"
        )
        bcasts = plan.count("BroadcastExchange")
        smj = plan.count("SortMergeJoin")
        arrow = plan.count("MapInPandas") + plan.count("FlatMapGroupsInPandas")
        hard = [p for p in HARD_BAD if p in plan]
        soft = [p for p in SOFT_FLAG if p in plan]
        if hard:
            bad += 1
        rows.append((name, shuffles, bcasts, smj, arrow, ",".join(hard + soft)))
    w = max(len(r[0]) for r in rows)
    print(f"{'query':<{w}}  sh  bc smj arw flags")
    for name, sh, bc, smj, arw, flags in rows:
        print(f"{name:<{w}}  {sh:>2}  {bc:>2} {smj:>3} {arw:>3} {flags}")
    spark.stop()
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
