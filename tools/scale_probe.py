"""Scaling-behavior probe: how do the headline operators scale with data size?

Builds synthetic ×K replicas of the sf0.1 testdata in /tmp (fact tables
replicated with key offsets so cardinalities really grow; dimensions kept —
more facts per dim key, the realistic shape), then times a probe set at ×1
and ×K and reports the time ratio against the ideal K.

A ratio ≈ K means linear scaling (shuffle/agg dominated); ≪ K means fixed
overhead still dominates at this size; ≫ K means a super-linear term (the
thing this probe exists to catch — e.g. an accidental all-pairs join would
show ~K²).

Usage: python tools/scale_probe.py [K] [query ...]
Prints one JSON line per query: {"query": ..., "t1": ..., "tK": ...,
"ratio": ..., "k": K}.

Measured (round 3, local[32], K=16 → 9.6M lineitem / 80k docs):
  star_join_agg 3.01×, dedup_minhash_lsh 3.04×, text_boilerplate 2.96×,
  negative_sampling 1.87×, bpe_learn_merges 1.03× — all strongly
  sublinear in K (parallel slack absorbs the growth; no super-linear
  term anywhere). bpe at ~1× confirms the vocabulary-bound loop design:
  16× the corpus barely moves it. At K=4 every ratio was ≈1 — pure
  fixed-overhead regime.

Round-3 additions at K=16: embedding_pca_power 3.35×, events_twap 2.0×,
events_ewma 1.71×, text_chunk_overlap 4.52×, graph_triangles 7.1×. The
triangle ratio is a REPLICATION artifact, not a plan flaw: offsetting
order keys but not part keys multiplies every pair's co-purchase support
by K, so far more pairs clear the support floor and the graph densifies —
organic growth adds new parts and keeps the floored edge set sparse (the
operator's docstring documents that invariant).

Round-4 additions at K=16: quality_filter_rules 1.55× (pure scan — fixed
overhead still dominates at 80k docs), dedup_semantic_clusters 3.23×
(bucketed LSH self-join + O(log d) CC rounds absorb the 16× growth; no
super-linear term), token_budget_fill 1.48× (one keyed window),
drift_binned 1.02× (two scans into O(bins) state — pure fixed-overhead
regime).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from us_flight_bigdata_dashboard_spark.registry import queries
from us_flight_bigdata_dashboard_spark.session import get_spark
from us_flight_bigdata_dashboard_spark.sources.catalog import TABLES, load_table

BASE_SF = "/root/testdata/sf0.1"

# fact-shaped tables get replicated with offsets on their surrogate keys;
# dimension tables are copied once
FACT_OFFSETS = {
    "orders": ["o_orderkey"],
    "lineitem": ["l_orderkey"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
    "events": ["event_id"],
}

DEFAULT_PROBES = [
    "star_join_agg",
    "pricing_summary",
    "dedup_minhash_lsh",
    "dedup_exact",
    "text_quality",
    "text_boilerplate",
    "events_sessionize",
    "knn_bruteforce",
    "negative_sampling",
    "bpe_learn_merges",
]


def build_scaled(spark, out_dir: str, k: int) -> None:
    for name in TABLES:
        df = load_table(spark, BASE_SF, name)
        if name in FACT_OFFSETS and k > 1:
            keys = FACT_OFFSETS[name]
            offsets = {c: df.agg(F.max(c)).collect()[0][0] + 1 for c in keys}
            parts = [df]
            for i in range(1, k):
                shifted = df
                for c, off in offsets.items():
                    shifted = shifted.withColumn(c, F.col(c) + F.lit(i * off))
                parts.append(shifted)
            out = parts[0]
            for p in parts[1:]:
                out = out.unionByName(p)
        else:
            out = df
        out.write.mode("overwrite").parquet(os.path.join(out_dir, f"{name}.parquet"))


def timed(fn, spark, sf_dir) -> float:
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        fn(spark, sf_dir).collect()
        best = min(best, time.perf_counter() - t0)
    spark.catalog.clearCache()
    return best


def main() -> int:
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    probes = sys.argv[2:] or DEFAULT_PROBES
    spark = get_spark("scale-probe")
    spark.range(1000).selectExpr("sum(id)").collect()

    scaled_dir = tempfile.mkdtemp(prefix=f"scale_x{k}_")
    try:
        build_scaled(spark, scaled_dir, k)
        qs = queries()
        for name in probes:
            fn = qs[name]
            t1 = timed(fn, spark, BASE_SF)
            tk = timed(fn, spark, scaled_dir)
            print(
                json.dumps(
                    {
                        "query": name,
                        "t1": round(t1, 3),
                        "tK": round(tk, 3),
                        "ratio": round(tk / t1, 2),
                        "k": k,
                    }
                ),
                flush=True,
            )
    finally:
        shutil.rmtree(scaled_dir, ignore_errors=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
