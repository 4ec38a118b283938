"""Crafted tests for the round-4 additions: multi-touch linear attribution
(hand-computed credit split + direct fallthrough) and MMR diverse selection
(verified against an independent sequential Python replica)."""

from __future__ import annotations

import datetime

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from us_flight_bigdata_dashboard_spark.operators import events as ev
from us_flight_bigdata_dashboard_spark.operators import similarity as sim

T0 = datetime.datetime(2024, 1, 1)


def _write_events(tmp_path, rows):
    """rows: (event_id, minutes_after_t0, user_id, event_type, value)."""
    tbl = pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array(
                [T0 + datetime.timedelta(minutes=r[1]) for r in rows],
                pa.timestamp("us"),
            ),
            "user_id": pa.array([r[2] for r in rows], pa.int64()),
            "event_type": pa.array([r[3] for r in rows], pa.string()),
            "value": pa.array([r[4] for r in rows], pa.float64()),
            "props": pa.array(["{}"] * len(rows), pa.string()),
        }
    )
    pq.write_table(tbl, str(tmp_path / "events.parquet"))


def test_linear_attribution_splits_and_direct(tmp_path, spark):
    # user 1: view@0, click@60, purchase@120 (both touches in 6h window:
    # 10.0 split 5/5) — then purchase@1200 value 8.0, nearest touch 19h
    # old -> direct.
    # user 2: click@0, purchase@30 value 4.0 -> click gets all 4.
    _write_events(
        tmp_path,
        [
            (1, 0, 1, "view", 1.0),
            (2, 60, 1, "click", 1.0),
            (3, 120, 1, "purchase", 10.0),
            (4, 1200, 1, "purchase", 8.0),
            (5, 0, 2, "click", 1.0),
            (6, 30, 2, "purchase", 4.0),
        ],
    )
    rows = {
        r["channel"]: (r["n_credits"], r["attributed_value"])
        for r in ev.q_events_attribution_linear(spark, str(tmp_path)).collect()
    }
    assert rows == {"view": (1, 5.0), "click": (2, 9.0), "direct": (1, 8.0)}


def test_mmr_matches_sequential_python_replica(tmp_path, spark):
    rng = np.random.RandomState(7)
    vecs = rng.rand(9, 8).astype(np.float32)
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array(range(9), pa.int64()),
                "embedding": pa.array(
                    [list(v) for v in vecs], pa.list_(pa.float32())
                ),
                "label": pa.array([0] * 9, pa.int32()),
            }
        ),
        str(tmp_path / "embeddings.parquet"),
    )

    def dot(a, b):
        acc = 0.0
        for x, y in zip(a, b):
            acc = acc + float(x) * float(y)
        return acc

    def cos(a, b):
        return dot(a, b) / ((dot(a, a) ** 0.5) * (dot(b, b) ** 0.5))

    q = vecs[sim.MMR_QUERY_VEC]
    pool = sorted(
        ((cos(v, q), i) for i, v in enumerate(vecs) if i != sim.MMR_QUERY_VEC),
        key=lambda t: (-t[0], t[1]),
    )[: sim.MMR_POOL]
    lam = sim.MMR_LAMBDA
    picked = []
    for _ in range(sim.MMR_K):
        best = None
        for rel, i in pool:
            if i in picked:
                continue
            if picked:
                pen = max(cos(vecs[i], vecs[j]) for j in picked)
                score = lam * rel - (1.0 - lam) * pen
            else:
                score = lam * rel
            if best is None or (score, -i) > (best[0], -best[1]):
                best = (score, i)
        picked.append(best[1])

    got = [
        r["vec_id"]
        for r in sim.q_embedding_mmr_select(spark, str(tmp_path))
        .orderBy("rank")
        .collect()
    ]
    assert got == picked
