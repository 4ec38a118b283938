"""Planted-ground-truth tests for the final round-7 additions: the
seasonality-adjusted anomaly screen (including its rush-hour-immunity
claim), the traffic envelope's exact rank picks, the rich-club coefficient
on a hand-built K4-plus-pendant, and the tercile migration matrix."""

from __future__ import annotations

import os

import pytest

from us_flight_bigdata_dashboard_spark.operators.decision import (
    q_customer_migration_matrix,
)
from us_flight_bigdata_dashboard_spark.operators.events import (
    q_events_seasonal_anomaly,
    q_events_traffic_envelope,
)
from us_flight_bigdata_dashboard_spark.operators.graph import q_graph_rich_club
from us_flight_bigdata_dashboard_spark.operators.relational import (
    q_scan_fixedwidth_roundtrip,
)


def _write(spark, root, name, rows, schema, ts_cols=()):
    df = spark.createDataFrame(rows, schema)
    for c in ts_cols:
        df = df.withColumn(c, df[c].cast("timestamp"))
    df.write.mode("overwrite").parquet(os.path.join(root, f"{name}.parquet"))


EV_SCHEMA = (
    "event_id bigint, ts string, user_id bigint, event_type string, "
    "value double, props string"
)
ORDERS_SCHEMA = (
    "o_orderkey bigint, o_custkey bigint, o_orderstatus string, "
    "o_totalprice double, o_orderdate string, o_orderpriority string"
)
LINEITEM_SCHEMA = (
    "l_orderkey bigint, l_partkey bigint, l_suppkey bigint, l_linenumber bigint, "
    "l_quantity double, l_extendedprice double, l_discount double, l_tax double, "
    "l_returnflag string, l_linestatus string, l_shipdate string"
)


def test_seasonal_anomaly_rush_hour_immunity(spark, tmp_path_factory):
    """A 10-event rush at hour 12 EVERY day matches its own profile —
    never flagged. One extra burst on a single day IS flagged."""
    root = str(tmp_path_factory.mktemp("r7f_sa"))
    rows, eid = [], 0
    for d in range(1, 15):  # two full weeks
        for h in range(24):
            n = 10 if h == 12 else 1
            if d == 7 and h == 3:
                n = 40  # the genuine anomaly: a 3am burst on day 7
            for _ in range(n):
                eid += 1
                rows.append((eid, f"2024-01-{d:02d} {h:02d}:20:00", 1, "click", 0.0, "{}"))
    _write(spark, root, "events", rows, EV_SCHEMA, ts_cols=("ts",))
    out = q_events_seasonal_anomaly(spark, root).collect()
    hours = [(r["hour_idx"] % 24) for r in out]
    assert 3 in hours  # burst flagged
    assert 12 not in hours  # daily rush never flagged


def test_traffic_envelope_exact_picks(spark, tmp_path_factory):
    """Hour 5 sees daily counts 1..10 over ten days → p10 = 1 (rank 1),
    p50 = 5 (rank ceil(10/2)... lower median), p90 = 9 (rank 9)."""
    root = str(tmp_path_factory.mktemp("r7f_env"))
    rows, eid = [], 0
    for d in range(1, 11):
        for _ in range(d):  # day d has d events at hour 05
            eid += 1
            rows.append((eid, f"2024-01-{d:02d} 05:30:00", 1, "e", 0.0, "{}"))
        # anchor events so the spine covers hour 0..23 of every day
        eid += 1
        rows.append((eid, f"2024-01-{d:02d} 00:00:05", 1, "e", 0.0, "{}"))
    rows.append((eid + 1, "2024-01-10 23:59:00", 1, "e", 0.0, "{}"))
    _write(spark, root, "events", rows, EV_SCHEMA, ts_cols=("ts",))
    out = {r["hod"]: r for r in q_events_traffic_envelope(spark, root).collect()}
    r5 = out[5]
    assert r5["n_days"] == 10
    assert (r5["p10"], r5["p50"], r5["p90"]) == (1, 5, 9)


def test_rich_club_k4_plus_pendant(spark, tmp_path_factory):
    """K4 (each pair co-purchased twice ⇒ 6 edges, degree 3) plus a
    pendant part: the k=2 club is exactly the K4 — φ = 1.0."""
    root = str(tmp_path_factory.mktemp("r7f_rc"))
    pairs = [(a, b) for a in range(1, 5) for b in range(a + 1, 5)]
    li, k, o = [], 0, 0
    for a, b in pairs:
        for _ in range(2):  # support 2 per K4 edge
            o += 1
            for p in (a, b):
                k += 1
                li.append((o, p, 1, k, 1.0, 10.0, 0.0, 0.0, "A", "O", "1995-01-01"))
    for _ in range(2):  # pendant edge 1-9, support 2
        o += 1
        for p in (1, 9):
            k += 1
            li.append((o, p, 1, k, 1.0, 10.0, 0.0, 0.0, "A", "O", "1995-01-01"))
    _write(spark, root, "lineitem", li, LINEITEM_SCHEMA)
    out = {r["k"]: r for r in q_graph_rich_club(spark, root).collect()}
    assert out[2]["n_club"] == 4 and out[2]["e_club"] == 6
    assert out[2]["phi"] == pytest.approx(1.0, abs=0)
    assert out[8]["n_club"] == 0 and out[8]["phi"] is None


def test_migration_matrix_planted_transitions(spark, tmp_path_factory):
    """Three customers active both years with reversed revenue order →
    T1→T3, T2→T2, T3→T1; customer 4 only in year one (T?→NONE wait —
    with 3 active in each year the terciles are singletons); customer 5
    never active → NONE→NONE."""
    root = str(tmp_path_factory.mktemp("r7f_mig"))
    _write(
        spark,
        root,
        "customer",
        [(c, f"C{c}", 0, 0.0, "B") for c in range(1, 6)],
        "c_custkey bigint, c_name string, c_nationkey int, c_acctbal double, c_mktsegment string",
    )
    orders = [
        # 1995: c1=100 (T1), c2=200 (T2), c3=300 (T3)
        (1, 1, "O", 100.0, "1995-06-01", "P"),
        (2, 2, "O", 200.0, "1995-06-01", "P"),
        (3, 3, "O", 300.0, "1995-06-01", "P"),
        # 1996: reversed: c1=300 (T3), c2=200 (T2), c3=100 (T1)
        (4, 1, "O", 300.0, "1996-06-01", "P"),
        (5, 2, "O", 200.0, "1996-06-01", "P"),
        (6, 3, "O", 100.0, "1996-06-01", "P"),
        # customer 4 active only in 1995 (lowest → T1 of four? no: 4 actives)
    ]
    _write(spark, root, "orders", orders, ORDERS_SCHEMA, ts_cols=("o_orderdate",))
    out = {(r["seg_from"], r["seg_to"]): r["n_customers"]
           for r in q_customer_migration_matrix(spark, root).collect()}
    assert out[("T1", "T3")] == 1
    assert out[("T2", "T2")] == 1
    assert out[("T3", "T1")] == 1
    assert out[("NONE", "NONE")] == 2  # customers 4 and 5 inactive both years


def test_fixedwidth_roundtrip_digest_rows(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("r7f_fw"))
    li = [
        (1, 1, 1, 1, 1.0, 1234.56, 0.0, 0.0, "A", "O", "1995-01-02"),
        (2, 1, 1, 2, 1.0, 99.99, 0.0, 0.0, "R", "O", "1995-03-04"),
        (3, 1, 1, 3, 1.0, 100000.01, 0.0, 0.0, "N", "O", "1995-05-06"),
    ]
    _write(spark, root, "lineitem", li, LINEITEM_SCHEMA, ts_cols=("l_shipdate",))
    out = q_scan_fixedwidth_roundtrip(spark, root).collect()[0]
    assert out["n_rows"] == 3
    # digests are data-dependent; the invariant here is non-degeneracy
    assert out["h_price"] != out["h_orderkey"]


def test_histogram_quantile_error_bound(spark):
    """On real sf0.001 data the sketch estimate must sit within its own
    shipped error bound of the EXACT quantile (duckdb quantile_disc)."""
    import duckdb

    from us_flight_bigdata_dashboard_spark.operators.sketches import (
        HISTQ_QS,
        q_sketch_histogram_quantile,
    )

    sf = "/root/testdata/sf0.001"
    rows = {r["quantile"]: r for r in q_sketch_histogram_quantile(spark, sf).collect()}
    con = duckdb.connect()
    for q in HISTQ_QS:
        exact = con.sql(
            f"SELECT quantile_disc(o_totalprice, {q}) FROM '{sf}/orders.parquet'"
        ).fetchone()[0]
        r = rows[q]
        assert abs(r["estimate"] - exact) <= r["error_bound"] + 1e-9


def test_scd2_interval_audit_contract(spark, tmp_path_factory):
    """On any orders fixture the derived SCD2 history must tile perfectly:
    zero tiling breaks, exactly one open version per key, and version
    counts match the ≡0 (mod 7) re-price rule."""
    from us_flight_bigdata_dashboard_spark.operators.mutation import (
        q_scd2_interval_audit,
    )

    root = str(tmp_path_factory.mktemp("r7f_scd2a"))
    orders = [
        (k, 1, "O", 100.0 + k, "1995-01-0%d" % ((k % 9) + 1), "P")
        for k in range(1, 15)
    ]
    _write(spark, root, "orders", orders, ORDERS_SCHEMA, ts_cols=("o_orderdate",))
    out = {r["n_versions"]: r for r in q_scd2_interval_audit(spark, root).collect()}
    assert out[1]["n_keys"] == 12  # keys 1..14 except 7 and 14
    assert out[2]["n_keys"] == 2   # keys 7 and 14 re-price
    for r in out.values():
        assert r["tiling_breaks"] == 0
        assert r["open_version_violations"] == 0


def test_single_source_planted(spark, tmp_path_factory):
    from us_flight_bigdata_dashboard_spark.operators.decision import (
        q_single_source_parts,
    )

    root = str(tmp_path_factory.mktemp("r7f_ss"))
    _write(
        spark,
        root,
        "part",
        [(1, "P1", "BRAND#1", "t", 1, 1.0), (2, "P2", "BRAND#1", "t", 1, 1.0)],
        "p_partkey bigint, p_name string, p_brand string, p_type string, p_size int, p_retailprice double",
    )
    # part 1: two suppliers; part 2: one supplier (at risk), revenue 30
    li = [
        (1, 1, 10, 1, 1.0, 50.0, 0.0, 0.0, "A", "O", "1995-01-01"),
        (2, 1, 20, 1, 1.0, 20.0, 0.0, 0.0, "A", "O", "1995-01-01"),
        (3, 2, 10, 1, 1.0, 30.0, 0.0, 0.0, "A", "O", "1995-01-01"),
    ]
    _write(spark, root, "lineitem", li, LINEITEM_SCHEMA)
    out = q_single_source_parts(spark, root).collect()[0]
    assert out["n_parts"] == 2 and out["n_single_source"] == 1
    assert out["at_risk_cents"] == 3000
    assert out["at_risk_revenue_share"] == pytest.approx(3000 / 10000, abs=0)


def test_xyz_classes_planted(spark, tmp_path_factory):
    """Steady part (same qty every month) → X; spiky part (all demand in
    one of 4 months) → Z (CV = sqrt(3) ≥ 1); no-demand part → NO_DEMAND."""
    from us_flight_bigdata_dashboard_spark.operators.decision import (
        q_xyz_demand_class,
    )

    root = str(tmp_path_factory.mktemp("r7f_xyz"))
    _write(
        spark,
        root,
        "part",
        [(p, f"P{p}", "BRAND#1", "t", 1, 1.0) for p in (1, 2, 3)],
        "p_partkey bigint, p_name string, p_brand string, p_type string, p_size int, p_retailprice double",
    )
    li, k = [], 0
    for m in range(1, 5):  # months Jan..Apr
        k += 1  # part 1: qty 10 every month → CV 0 → X
        li.append((k, 1, 1, 1, 10.0, 1.0, 0.0, 0.0, "A", "O", f"1995-{m:02d}-10"))
    k += 1  # part 2: qty 40 in one month only → CV sqrt(3) → Z
    li.append((k, 2, 1, 1, 40.0, 1.0, 0.0, 0.0, "A", "O", "1995-02-10"))
    _write(spark, root, "lineitem", li, LINEITEM_SCHEMA, ts_cols=("l_shipdate",))
    out = {(r["p_brand"], r["xyz_class"]): r["n_parts"]
           for r in q_xyz_demand_class(spark, root).collect()}
    assert out[("BRAND#1", "X")] == 1
    assert out[("BRAND#1", "Z")] == 1
    assert out[("BRAND#1", "NO_DEMAND")] == 1
