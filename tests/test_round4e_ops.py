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


def _write_tbl(tmp_path, name, cols):
    pq.write_table(pa.table(cols), str(tmp_path / f"{name}.parquet"))


def test_lpa_communities_two_cliques(tmp_path, spark):
    """Two disjoint strong-edge bicliques -> two communities labeled by
    their min node id; the weak (below-floor) bridge edge between them is
    dropped by the scale-relative support floor."""
    from us_flight_bigdata_dashboard_spark.operators.graph import q_graph_communities

    # customers 1,2 <-> suppliers 1,2 (heavy: 5 co-orders each)
    # customers 3,4 <-> suppliers 3,4 (heavy)
    # customer 1 -> supplier 3: ONE co-order (below 2.5x mean -> dropped)
    orders_rows = []
    li_rows = []
    oid = 0
    def add(cust, supp, n):
        nonlocal oid
        for _ in range(n):
            oid += 1
            orders_rows.append((oid, cust))
            li_rows.append((oid, supp))
    for c in (1, 2):
        for s in (1, 2):
            add(c, s, 5)
    for c in (3, 4):
        for s in (3, 4):
            add(c, s, 5)
    add(1, 3, 1)
    # weight-1 noise pairs: the realistic long tail the MEAN-multiple floor
    # is calibrated against (with only strong edges the mean IS the strong
    # weight and everything would be floored away)
    for c in range(10, 30):
        for s in range(10, 30):
            add(c, s, 1)
    _write_tbl(tmp_path, "orders", {
        "o_orderkey": pa.array([r[0] for r in orders_rows], pa.int64()),
        "o_custkey": pa.array([r[1] for r in orders_rows], pa.int64()),
    })
    _write_tbl(tmp_path, "lineitem", {
        "l_orderkey": pa.array([r[0] for r in li_rows], pa.int64()),
        "l_suppkey": pa.array([r[1] for r in li_rows], pa.int64()),
    })
    rows = q_graph_communities(spark, str(tmp_path)).collect()
    got = {r["community"]: (r["n_members"], r["n_customers"], r["n_suppliers"]) for r in rows}
    # Semi-sync LPA: round 1 gives every clique member the clique's min
    # SUPPLIER node label (customers adopt min supplier, suppliers then
    # adopt that relayed label) — supplier nodes 2*1+1=3 and 2*3+1=7.
    assert got == {3: (4, 2, 2), 7: (4, 2, 2)}


def test_group_mode_tie_breaks_to_smallest_value(tmp_path, spark):
    from us_flight_bigdata_dashboard_spark.operators.breadth import q_group_mode

    _write_tbl(tmp_path, "lineitem", {
        "l_returnflag": pa.array(["A"] * 4, pa.string()),
        "l_linestatus": pa.array(["F"] * 4, pa.string()),
        "l_quantity": pa.array([7.0, 7.0, 3.0, 3.0], pa.float64()),
    })
    [row] = q_group_mode(spark, str(tmp_path)).collect()
    assert (row["mode_quantity"], row["mode_count"]) == (3.0, 2)


def test_target_encode_ignores_validation_fold(tmp_path, spark):
    """Rows hash-assigned outside the train fold must not move the encoder:
    perturbing a valid-fold customer's order prices leaves every encoded
    value bit-identical."""
    from us_flight_bigdata_dashboard_spark.operators.statistics import (
        TE_TRAIN_PCT,
        q_target_encode_smoothed,
    )
    import hashlib

    def bucket(custkey: int) -> int:
        return int(hashlib.md5(str(custkey).encode()).hexdigest()[:15], 16) % 100

    train_cust = next(c for c in range(1, 100) if bucket(c) < TE_TRAIN_PCT)
    valid_cust = next(c for c in range(1, 100) if bucket(c) >= TE_TRAIN_PCT)
    _write_tbl(tmp_path, "customer", {
        "c_custkey": pa.array([train_cust, valid_cust], pa.int64()),
        "c_mktsegment": pa.array(["SEG", "SEG"], pa.string()),
    })

    def orders_with(valid_price):
        return {
            "o_custkey": pa.array([train_cust, train_cust, valid_cust], pa.int64()),
            "o_totalprice": pa.array([100.0, 200.0, valid_price], pa.float64()),
        }

    _write_tbl(tmp_path, "orders", orders_with(1.0))
    a = q_target_encode_smoothed(spark, str(tmp_path)).collect()
    _write_tbl(tmp_path, "orders", orders_with(999999.0))
    b = q_target_encode_smoothed(spark, str(tmp_path)).collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]
    assert a[0]["n_train"] == 2


def test_asof_nearest_tie_and_directions(tmp_path, spark):
    """Equal-distance tie resolves BACKWARD; clicks before any view go
    forward; clicks after the last view go backward; equal-ts view is
    distance 0 via the backward branch."""
    from us_flight_bigdata_dashboard_spark.operators.temporal import (
        q_asof_join_nearest,
    )

    rows = [
        # (event_id, minutes, user, type)
        (1, 10, 1, "view"),
        (2, 20, 1, "click"),   # 10min back vs 10min fwd -> backward (id 1)
        (3, 30, 1, "view"),
        (4, 0, 2, "click"),    # before any view -> forward (id 5)
        (5, 60, 2, "view"),
        (6, 100, 2, "click"),  # after last view -> backward (id 5)
        (7, 40, 3, "view"),
        (8, 40, 3, "click"),   # equal ts -> backward, gap 0
    ]
    _write_events(tmp_path, [(e, m, u, t, 1.0) for e, m, u, t in rows])

    got = {
        r["click_event_id"]: (r["nearest_view_event_id"], r["direction"], r["gap_us"])
        for r in q_asof_join_nearest(spark, str(tmp_path)).collect()
    }
    assert got == {
        2: (1, "backward", 10 * 60 * 1_000_000),
        4: (5, "forward", 60 * 60 * 1_000_000),
        6: (5, "backward", 40 * 60 * 1_000_000),
        8: (7, "backward", 0),
    }
