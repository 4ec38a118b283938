"""AQE skew-join conversion, demonstrated live (not just configured).

The 100 TB story claims AQE re-plans skewed joins at runtime; this test
makes the claim falsifiable on local[32]: a 90%-one-key join under
test-scaled thresholds must execute with ``SortMergeJoin(skew=true)`` and
a ``skewed`` AQEShuffleRead in the FINAL adaptive plan.

The negative case documents the real-world catch found while writing
this: when a downstream operator REUSES the join's hash partitioning
(groupBy on the join key), OptimizeSkewedJoin declines — splitting the
skewed partition would force an extra shuffle to restore the required
distribution, and AQE won't pay that without
``forceOptimizeSkewedJoin``. At scale that means: aggregate on the join
key AFTER a skewed join and you silently forfeit skew handling — either
force it, or pre-aggregate.
"""

from __future__ import annotations

import re
from contextlib import contextmanager

from pyspark.sql import functions as F

_CONFS = {
    "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
    "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "64KB",
    "spark.sql.adaptive.advisoryPartitionSizeInBytes": "32KB",
    "spark.sql.autoBroadcastJoinThreshold": "-1",
}


@contextmanager
def _skew_confs(spark):
    old = {k: spark.conf.get(k, None) for k in _CONFS}
    for k, v in _CONFS.items():
        spark.conf.set(k, v)
    try:
        yield
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def _skewed_join(spark):
    left = spark.range(2_000_000).select(
        F.when(F.col("id") % 10 < 9, 0).otherwise(F.col("id")).alias("k"),
        F.col("id").alias("v"),
    )
    right = spark.range(2000).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("w")
    )
    return left.join(right.hint("merge"), "k")


def test_aqe_splits_skewed_join_partition(spark):
    with _skew_confs(spark):
        j = _skewed_join(spark).agg(
            F.sum("v").alias("sv"), F.count(F.lit(1)).alias("n")
        )
        [row] = j.collect()
        assert row["n"] == 1_800_200  # 90% of 2M on k=0 (+200 tail matches)
        plan = j._jdf.queryExecution().executedPlan().toString()
    assert "isFinalPlan=true" in plan
    assert re.search(r"SortMergeJoin\(skew=true\)", plan), plan[:2000]
    assert "skewed" in plan  # AQEShuffleRead ... skewed


def test_downstream_partition_reuse_blocks_skew_split(spark):
    """groupBy on the join key pins the join's output distribution, so
    OptimizeSkewedJoin must decline (no skew markers) — the documented
    trade, not a bug; forceOptimizeSkewedJoin would override."""
    with _skew_confs(spark):
        j = _skewed_join(spark).groupBy("k").agg(F.count(F.lit(1)).alias("n"))
        rows = j.collect()
        assert len(rows) == 201
        plan = j._jdf.queryExecution().executedPlan().toString()
    assert "isFinalPlan=true" in plan
    assert "skew=true" not in plan
