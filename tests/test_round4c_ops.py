"""Crafted semantics tests for the drift monitor and the token-budget
mixture fill."""

from __future__ import annotations

import datetime

import pyarrow as pa
import pyarrow.parquet as pq


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


def test_drift_zero_on_identical_halves(spark, tmp_path):
    """Same value multiset in both time halves ⇒ p_a == p_b in every bin ⇒
    every drift term is exactly 0.0 (double subtraction of equal values)."""
    from us_flight_bigdata_dashboard_spark.operators.statistics import (
        q_drift_binned,
    )

    rows = []
    for i in range(50):
        rows.append((i, i, 1, float(i % 10)))            # half A: s 0..49
        rows.append((100 + i, 50 + i, 1, float(i % 10)))  # half B: s 50..99
    sf = _write_events(tmp_path, rows)
    out = q_drift_binned(spark, sf).collect()
    assert len(out) > 1
    for r in out:
        assert r["n_a"] == r["n_b"]
        assert r["drift_term"] == 0.0


def test_drift_detects_full_shift(spark, tmp_path):
    """Half A all at the low extreme, half B all at the high extreme ⇒ the
    low bin and high bin each get the maximal term 1.0."""
    from us_flight_bigdata_dashboard_spark.operators.statistics import (
        DRIFT_N_BINS,
        q_drift_binned,
    )

    rows = [(i, i, 1, 0.0) for i in range(50)] + [
        (100 + i, 50 + i, 1, 10.0) for i in range(50)
    ]
    sf = _write_events(tmp_path, rows)
    got = {r["bin"]: r for r in q_drift_binned(spark, sf).collect()}
    assert set(got) == {0, DRIFT_N_BINS - 1}
    assert got[0]["p_a"] == 1.0 and got[0]["p_b"] == 0.0
    assert got[0]["drift_term"] == 1.0
    assert got[DRIFT_N_BINS - 1]["drift_term"] == 1.0


def _write_documents(tmp_path, rows):
    """rows: list of (doc_id, text, source)."""
    tbl = pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows], pa.int64()),
            "text": pa.array([r[1] for r in rows], pa.string()),
            "lang": pa.array(["en"] * len(rows), pa.string()),
            "source": pa.array([r[2] for r in rows], pa.string()),
            "n_chars": pa.array([len(r[1]) for r in rows], pa.int64()),
        }
    )
    pq.write_table(tbl, str(tmp_path / "documents.parquet"))
    return str(tmp_path)


def test_token_budget_fill_cuts_head_keeps_tail(spark, tmp_path):
    """Big source (100 tokens) vs small source (10 tokens), budget frac
    0.5: sqrt-temperature targets keep the small source whole (target 13 >
    10) and cut the big source at 41 tokens → exactly 4 of its 10-token
    docs survive. Every kept row's cumsum must respect its target."""
    from us_flight_bigdata_dashboard_spark.operators.sampling import (
        q_token_budget_fill,
    )

    docs = [(i, " ".join(f"t{j}" for j in range(10)), "big") for i in range(10)]
    docs += [(100 + i, " ".join(f"s{j}" for j in range(5)), "small") for i in range(2)]
    sf = _write_documents(tmp_path, docs)
    rows = q_token_budget_fill(spark, sf).collect()
    by_src = {}
    for r in rows:
        by_src.setdefault(r["source"], []).append(r)
        assert r["cum_tokens"] <= r["target_tokens"]
    assert len(by_src["small"]) == 2          # tail source fully kept
    assert len(by_src["big"]) == 4            # head cut at the 41-token target
    assert max(r["cum_tokens"] for r in by_src["big"]) == 40


def test_token_budget_fill_partitioning_invariant(spark, tmp_path):
    """The selected set is a pure function of the corpus — identical under
    a different shuffle partitioning (the reproducibility contract RNG
    sampling cannot give)."""
    from us_flight_bigdata_dashboard_spark.operators.sampling import (
        q_token_budget_fill,
    )

    docs = [(i, " ".join(f"w{i}_{j}" for j in range(3 + i % 7)), f"s{i % 3}") for i in range(60)]
    sf = _write_documents(tmp_path, docs)
    a = sorted(tuple(r) for r in q_token_budget_fill(spark, sf).collect())
    old = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "3")
        b = sorted(tuple(r) for r in q_token_budget_fill(spark, sf).collect())
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)
    assert a == b


def test_token_budget_fill_is_hash_order_prefix(spark, tmp_path):
    """Per source, the kept set must be a PREFIX of the md5-hash-ordered
    doc list (greedy fill never skips a cheaper-hash doc to take a later
    one) — verified against a python replica of the hash order."""
    import hashlib

    from us_flight_bigdata_dashboard_spark.operators.sampling import (
        q_token_budget_fill,
    )

    docs = [
        (i, " ".join(f"w{i}_{j}" for j in range(2 + (i * 7) % 11)), f"s{i % 4}")
        for i in range(80)
    ]
    sf = _write_documents(tmp_path, docs)
    kept = {}
    for r in q_token_budget_fill(spark, sf).collect():
        kept.setdefault(r["source"], set()).add(r["doc_id"])

    order = {}
    for i, _, src in docs:
        h = int(hashlib.md5(str(i).encode()).hexdigest()[:15], 16)
        order.setdefault(src, []).append((h, i))
    for src, ids in kept.items():
        ranked = [i for _, i in sorted(order[src])]
        assert ids == set(ranked[: len(ids)]), src
