"""Round-4 crafted tests: hot-key-safe EWMA two-level fold, large-star/
small-star connected components, fixed-point bound properties."""

from __future__ import annotations

import datetime

import pyarrow as pa
import pyarrow.parquet as pq
import pytest


def _write_events(tmp_path, rows):
    """rows: list of (event_id, ts_seconds, user_id, value)."""
    base = datetime.datetime(2024, 1, 1)
    tbl = pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array(
                [base + datetime.timedelta(seconds=r[1]) for r in rows],
                pa.timestamp("us"),
            ),
            "user_id": pa.array([r[2] for r in rows], pa.int64()),
            "event_type": pa.array(["view"] * len(rows), pa.string()),
            "value": pa.array([r[3] for r in rows], pa.float64()),
            "props": pa.array(["{}"] * len(rows), pa.string()),
        }
    )
    pq.write_table(tbl, str(tmp_path / "events.parquet"))
    return str(tmp_path)


def _chunked_ewma(vals, chunk, alpha=0.25):
    """Python replica of the two-level fold with the exact same operation
    order as the Spark/DuckDB expressions (Python floats ARE IEEE doubles)."""
    acc = None
    for ci in range(0, len(vals), chunk):
        ch = vals[ci : ci + chunk]
        if ci == 0:
            v = None
            for x in ch:
                v = x if v is None else v + alpha * (x - v)
            acc = v
        else:
            w, b = 1.0, 0.0
            for x in ch:
                w = w * (1.0 - alpha)
            for x in ch:
                b = b * (1.0 - alpha) + alpha * x
            acc = acc * w + b
    return acc


def _seq_ewma(vals, alpha=0.25):
    v = None
    for x in vals:
        v = x if v is None else v + alpha * (x - v)
    return v


def test_ewma_hot_key_bounded_chunks(spark, tmp_path, monkeypatch):
    """A key with many times EWMA_CHUNK events folds through bounded chunk
    summaries: the Spark result must equal the chunked-fold replica
    BIT-FOR-BIT and stay within fp noise of the plain sequential fold."""
    import us_flight_bigdata_dashboard_spark.operators.events as ev

    monkeypatch.setattr(ev, "EWMA_CHUNK", 7)
    # hot user 1: 23 events (4 chunks at C=7); user 2: exactly one chunk
    # boundary (7); user 3: single event (seed-only path)
    rows, eid = [], 0
    hot_vals = [((i * 37) % 101) / 7.0 + 0.125 for i in range(23)]
    for i, v in enumerate(hot_vals):
        rows.append((eid, i * 10, 1, v))
        eid += 1
    edge_vals = [1.5, -2.25, 3.0, 0.5, 10.0, -0.125, 7.75]
    for i, v in enumerate(edge_vals):
        rows.append((eid, i * 5, 2, v))
        eid += 1
    rows.append((eid, 0, 3, 42.5))

    sf_dir = _write_events(tmp_path, rows)
    out = {
        r["user_id"]: (r["n_events"], r["ewma_last"])
        for r in ev.q_events_ewma(spark, sf_dir).collect()
    }
    assert out[1] == (23, _chunked_ewma(hot_vals, 7))
    assert out[2] == (7, _chunked_ewma(edge_vals, 7))
    # single chunk ≡ plain sequential fold, bit-for-bit
    assert out[2][1] == _seq_ewma(edge_vals)
    assert out[3] == (1, 42.5)
    # the chunked composition is the same EWMA up to fp rounding
    assert out[1][1] == pytest.approx(_seq_ewma(hot_vals), rel=1e-9)


def test_ewma_oracle_matches_on_multichunk_input(spark, tmp_path, monkeypatch):
    """Cross-engine: with the REAL module constant patched small, Spark and
    a DuckDB oracle built with the same chunk size agree bit-for-bit on a
    multi-chunk key (the committed oracle string bakes in the production
    EWMA_CHUNK, so rebuild it with the patched constant)."""
    import duckdb

    import us_flight_bigdata_dashboard_spark.operators.events as ev

    monkeypatch.setattr(ev, "EWMA_CHUNK", 5)
    rows = [(i, i * 3, 9, ((i * 13) % 29) / 3.0 - 1.5) for i in range(17)]
    sf_dir = _write_events(tmp_path, rows)

    spark_out = {
        r["user_id"]: (r["n_events"], r["ewma_last"])
        for r in ev.q_events_ewma(spark, sf_dir).collect()
    }
    # the committed oracle template interpolated the import-time constant
    # (4096); swap it for the patched one
    sql = ev._ORACLE_EVENTS_EWMA.replace("// 4096", "// 5")
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM '{sf_dir}/events.parquet'")
    oracle_out = {u: (n, x) for u, n, x in con.execute(sql).fetchall()}
    assert spark_out == oracle_out


def test_large_small_star_chain_converges_logarithmically(spark):
    """A 64-node path (diameter 63) must converge in O(log d) rounds —
    min-label propagation would need ~63; large-star/small-star should
    need well under 12 — with every node labeled by the component min."""
    from us_flight_bigdata_dashboard_spark.operators.dedup import (
        MAX_LS_ITERS,
        large_small_star,
    )

    n = 64
    pairs = spark.createDataFrame(
        [(i + 100, i + 101) for i in range(n - 1)], "doc_a long, doc_b long"
    )
    labels, rounds = large_small_star(pairs)
    got = {r["doc_id"]: r["cluster_id"] for r in labels.collect()}
    assert got == {100 + i: 100 for i in range(n)}
    assert rounds < MAX_LS_ITERS, f"took all {rounds} rounds (no early fixed point)"
    assert rounds <= 8, f"chain of diameter {n - 1} took {rounds} rounds"


def test_large_small_star_matches_label_propagation_on_lsh_pairs(spark):
    """Same clusters as the label-propagation operator on the real LSH
    candidate pairs (both reduce to component-min labeling)."""
    from us_flight_bigdata_dashboard_spark.operators.dedup import (
        q_dedup_clusters,
        q_dedup_clusters_ls,
    )

    sf = "/root/testdata/sf0.001"
    a = sorted(tuple(r) for r in q_dedup_clusters(spark, sf).collect())
    b = sorted(tuple(r) for r in q_dedup_clusters_ls(spark, sf).collect())
    assert a == b


def test_large_small_star_forest_shapes(spark):
    """Two components (a triangle-with-tail and a separate edge) plus an
    isolated pair: exact labels, keeper = min per component."""
    from us_flight_bigdata_dashboard_spark.operators.dedup import large_small_star

    pairs = spark.createDataFrame(
        [(5, 9), (9, 7), (5, 7), (7, 11), (2, 3)], "doc_a long, doc_b long"
    )
    labels, _ = large_small_star(pairs)
    got = {r["doc_id"]: r["cluster_id"] for r in labels.collect()}
    assert got == {5: 5, 9: 5, 7: 5, 11: 5, 2: 2, 3: 2}


# --- fixed-point / 2^53 bound properties (claims from functions/exact.py
# and operators/graph.py docstrings, now enforced by tests) ----------------

from decimal import ROUND_HALF_UP, Decimal

from hypothesis import given, settings
from hypothesis import strategies as st


def _quant(x: float, scale: int = 4) -> Decimal:
    """Python mirror of Spark's double→DECIMAL(p,4) cast: shortest decimal
    repr (BigDecimal.valueOf semantics) then HALF_UP to the scale."""
    return Decimal(repr(x)).quantize(Decimal(1).scaleb(-scale), rounding=ROUND_HALF_UP)


@settings(max_examples=10, deadline=None)
@given(
    vals=st.lists(
        st.floats(min_value=-1e7, max_value=1e7, allow_nan=False), min_size=1, max_size=40
    ),
    nparts=st.integers(min_value=1, max_value=16),
)
def test_dsum_is_partition_invariant_and_exact(spark, vals, nparts):
    """dsum == the exact Decimal sum of HALF_UP-quantized addends, for ANY
    partitioning (the whole point of the decimal quantization)."""
    from us_flight_bigdata_dashboard_spark.functions.exact import dsum

    df = spark.createDataFrame([(v,) for v in vals], "x double").repartition(nparts)
    got = df.agg(dsum("x").alias("s")).collect()[0]["s"]
    want = float(sum(_quant(v) for v in vals))
    assert got == want


def test_dsum_near_2_53_bound_roundtrips_exactly(spark):
    """|sum|·10^4 just under 2^53: the final DECIMAL→DOUBLE conversion must
    still be exact (docstring bound: |sum| ≲ 9·10^11 at scale 4)."""
    from us_flight_bigdata_dashboard_spark.functions.exact import dsum

    # 1000 addends of ~8.9e8 with nontrivial decimals → sum ≈ 8.9e11,
    # sum·10^4 ≈ 8.9e15 < 2^53 ≈ 9.007e15 (within ~1.2% of the bound)
    vals = [8.9e8 + i * 0.0001 for i in range(1000)]
    want_dec = sum(_quant(v) for v in vals)
    assert int(want_dec.scaleb(4)) < 2**53, "test must sit under the bound"
    assert int(want_dec.scaleb(4)) > 2**53 * 0.98, "test must sit NEAR the bound"
    for nparts in (1, 7, 32):
        df = spark.createDataFrame([(v,) for v in vals], "x double").repartition(nparts)
        got = df.agg(dsum("x").alias("s")).collect()[0]["s"]
        assert got == float(want_dec)


def test_pagerank_fixed_point_sum_exact_at_bound(spark):
    """graph.py claims: ranks sum to 1 ⇒ Σ floor(contrib·10^15) ≤ 10^15 <
    2^53, so the integer contribution sum and its back-cast are exact.
    Exercise the exact boundary: 1000 contributions of 1e-3 (sum exactly
    1.0) plus a crafted irregular set."""
    from pyspark.sql import functions as F

    from us_flight_bigdata_dashboard_spark.operators.graph import PR_FP

    assert PR_FP < 2**53

    def spark_fp_sum(vals, nparts):
        df = spark.createDataFrame([(v,) for v in vals], "c double").repartition(nparts)
        return df.agg(
            F.sum(F.floor(F.col("c") * F.lit(float(PR_FP))).cast("decimal(38,0)"))
            .cast("double")
            .alias("s")
        ).collect()[0]["s"]

    import math

    full = [1e-3] * 1000  # floor(1e-3·1e15)·1000 == 10^15 exactly
    want = sum(math.floor(v * PR_FP) for v in full)
    assert want == PR_FP
    assert spark_fp_sum(full, 1) == float(want) == spark_fp_sum(full, 13)

    ragged = [0.1, 0.25, 1 / 3, 1 / 7, 0.05, 1e-15, 0.17]  # sums to < 1
    want_r = sum(math.floor(v * PR_FP) for v in ragged)
    assert want_r < 2**53
    assert spark_fp_sum(ragged, 1) == float(want_r) == spark_fp_sum(ragged, 5)
