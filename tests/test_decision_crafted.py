"""Crafted-data tests for the decision-support completion pack
(operators/decision.py): the trap cases each shape exists to exercise —
outer-join zero groups (Q13), EXISTS/NOT-EXISTS double correlation (Q21),
disjunctive arm boundaries (Q19), and aggregate-max ties (Q15)."""

from __future__ import annotations

import datetime

import pyarrow as pa
import pyarrow.parquet as pq

from us_flight_bigdata_dashboard_spark.operators import decision

TS = lambda s: datetime.datetime.fromisoformat(s)  # noqa: E731


def _write(tmp_path, name, cols):
    pq.write_table(pa.table(cols), str(tmp_path / f"{name}.parquet"))


def _geo(tmp_path, region_name="EUROPE"):
    """region 0 = the filter region; nation 0 in it; all suppliers in nation 0."""
    _write(tmp_path, "region", {"r_regionkey": [0, 1], "r_name": [region_name, "ASIA"]})
    _write(
        tmp_path,
        "nation",
        {"n_nationkey": [0, 1], "n_name": ["N0", "N1"], "n_regionkey": [0, 1]},
    )


def test_customer_order_distribution_counts_zero_order_customers(tmp_path, spark):
    # customer 1: one qualifying order; customer 2: only excluded-priority
    # orders (must land in the 0 bucket, NOT drop out); customer 3: no
    # orders at all.
    _write(tmp_path, "customer", {"c_custkey": [1, 2, 3]})
    _write(
        tmp_path,
        "orders",
        {
            "o_orderkey": [10, 20, 21],
            "o_custkey": [1, 2, 2],
            "o_orderpriority": ["1-URGENT", "5-LOW", "5-LOW"],
        },
    )
    rows = {
        r["c_count"]: r["custdist"]
        for r in decision.q_customer_order_distribution(spark, str(tmp_path)).collect()
    }
    assert rows == {0: 2, 1: 1}


def test_waiting_suppliers_sole_late_logic(tmp_path, spark):
    # Order 1 (F): supp 1 late, supp 2 on time  -> supp 1 counted.
    # Order 2 (F): supp 1 late, supp 2 late     -> nobody (two late).
    # Order 3 (F): supp 1 alone and late        -> nobody (single-supplier).
    # Order 4 (O): supp 1 late, supp 2 on time  -> nobody (status filter).
    _geo(tmp_path, decision.Q21_REGION)
    _write(
        tmp_path,
        "supplier",
        {"s_suppkey": [1, 2], "s_name": ["S1", "S2"], "s_nationkey": [0, 0]},
    )
    day0 = TS("1997-01-01")
    late = TS("1997-01-01") + datetime.timedelta(days=decision.Q21_LATE_DAYS + 5)
    ontime = TS("1997-01-10")
    _write(
        tmp_path,
        "orders",
        {
            "o_orderkey": [1, 2, 3, 4],
            "o_orderdate": pa.array([day0] * 4, pa.timestamp("us")),
            "o_orderstatus": ["F", "F", "F", "O"],
        },
    )
    _write(
        tmp_path,
        "lineitem",
        {
            "l_orderkey": [1, 1, 2, 2, 3, 4, 4],
            "l_suppkey": [1, 2, 1, 2, 1, 1, 2],
            "l_shipdate": pa.array(
                [late, ontime, late, late, late, late, ontime], pa.timestamp("us")
            ),
        },
    )
    rows = decision.q_waiting_suppliers(spark, str(tmp_path)).collect()
    assert [(r["s_name"], r["numwait"]) for r in rows] == [("S1", 1)]


def test_discounted_revenue_arms_are_exclusive_boundaries(tmp_path, spark):
    # One row per arm inside its (brand, size, qty) box, plus a row whose
    # brand matches arm 1 but whose quantity is outside every arm's range
    # (excluded), and a row below the weakest arm's minimum quantity
    # (excluded — also proves the derived pushdown conjunct is harmless).
    b1, b2, b3 = (a[0] for a in decision.Q19_ARMS)
    _write(
        tmp_path,
        "part",
        {
            "p_partkey": [1, 2, 3, 4],
            "p_brand": [b1, b2, b3, b1],
            "p_size": [3, 5, 10, 3],
        },
    )
    _write(
        tmp_path,
        "lineitem",
        {
            "l_partkey": [1, 2, 3, 4, 1],
            "l_quantity": [5.0, 15.0, 25.0, 50.0, 0.5],
            "l_extendedprice": [100.0, 100.0, 100.0, 100.0, 100.0],
            "l_discount": [0.0, 0.0, 0.0, 0.0, 0.0],
        },
    )
    [row] = decision.q_discounted_revenue_disjunctive(spark, str(tmp_path)).collect()
    assert row["revenue"] == 300.0


def test_top_supplier_returns_all_tied_maxima(tmp_path, spark):
    # Suppliers 1 and 2 have bit-identical revenue (same addends), 3 less.
    _write(
        tmp_path,
        "supplier",
        {"s_suppkey": [1, 2, 3], "s_name": ["S1", "S2", "S3"]},
    )
    in_q = TS(decision.Q15_DATE_LO) + datetime.timedelta(days=10)
    _write(
        tmp_path,
        "lineitem",
        {
            "l_suppkey": [1, 1, 2, 2, 3],
            "l_extendedprice": [100.0, 50.0, 100.0, 50.0, 10.0],
            "l_discount": [0.1, 0.2, 0.1, 0.2, 0.0],
            "l_shipdate": pa.array([in_q] * 5, pa.timestamp("us")),
        },
    )
    rows = decision.q_top_supplier(spark, str(tmp_path)).collect()
    assert [r["s_suppkey"] for r in rows] == [1, 2]
    assert rows[0]["total_revenue"] == rows[1]["total_revenue"] == 130.0


def test_abc_boundary_is_inclusive_and_decimal_exact(tmp_path, spark):
    """A part landing EXACTLY on the 80% cumulative share belongs to class
    A (<= cut, decimal cross-multiplication — no float drift can flip it).
    Revenues 60, 20, 15, 5: cum shares 60/80/95/100 -> A, A, B, C."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    pq.write_table(
        pa.table(
            {
                "l_partkey": pa.array([1, 2, 3, 4], pa.int64()),
                "l_extendedprice": pa.array([60.0, 20.0, 15.0, 5.0], pa.float64()),
                "l_discount": pa.array([0.0] * 4, pa.float64()),
            }
        ),
        str(tmp_path / "lineitem.parquet"),
    )
    rows = {
        r["abc_class"]: (r["n_parts"], r["class_revenue"])
        for r in decision.q_abc_pareto_class(spark, str(tmp_path)).collect()
    }
    assert rows == {"A": (2, 80.0), "B": (1, 15.0), "C": (1, 5.0)}


def test_fulfillment_percentiles_rank_targets(tmp_path, spark):
    """4 orders with durations 1,2,3,10 days in one priority: p50 = value
    at rank ceil(0.5*4)=2 -> 2 days; p90 = rank ceil(0.9*4)=4 -> 10 days
    (discrete quantiles — real data values, no interpolation)."""
    day0 = TS("1997-01-01")
    _write(
        tmp_path,
        "orders",
        {
            "o_orderkey": [1, 2, 3, 4],
            "o_orderdate": pa.array([day0] * 4, pa.timestamp("us")),
            "o_orderpriority": ["1-URGENT"] * 4,
        },
    )
    # two lines per order; fulfillment = MAX ship date
    li_rows = []
    for ok, d in [(1, 1), (2, 2), (3, 3), (4, 10)]:
        li_rows.append((ok, day0 + datetime.timedelta(days=1)))
        li_rows.append((ok, day0 + datetime.timedelta(days=d)))
    _write(
        tmp_path,
        "lineitem",
        {
            "l_orderkey": [r[0] for r in li_rows],
            "l_shipdate": pa.array([r[1] for r in li_rows], pa.timestamp("us")),
        },
    )
    [row] = decision.q_fulfillment_percentiles(spark, str(tmp_path)).collect()
    assert (row["n_orders"], row["p50_days"], row["p90_days"]) == (4, 2, 10)


def test_revenue_mix_shares_sum_to_one(tmp_path, spark):
    """Within every month the type shares sum to exactly 1.0 (the decimal
    month-total makes the denominators exact), and the first month of each
    type has a NULL delta."""
    day = TS("1997-03-15")
    _write(
        tmp_path,
        "part",
        {"p_partkey": [1, 2], "p_type": ["SMALL", "LARGE"]},
    )
    _write(
        tmp_path,
        "lineitem",
        {
            "l_partkey": [1, 2, 1, 2],
            "l_extendedprice": [10.0, 30.0, 5.0, 15.0],
            "l_discount": [0.0] * 4,
            "l_shipdate": pa.array(
                [day, day, day + datetime.timedelta(days=31), day + datetime.timedelta(days=31)],
                pa.timestamp("us"),
            ),
        },
    )
    rows = decision.q_revenue_mix_shift(spark, str(tmp_path)).collect()
    by_month: dict = {}
    for r in rows:
        by_month.setdefault(r["month"], []).append(r)
    for month, rs in by_month.items():
        assert sum(r["share"] for r in rs) == 1.0
    firsts = [r for r in rows if r["month"] == min(by_month)]
    assert all(r["share_delta"] is None for r in firsts)
    # shares: month1 SMALL 0.25 / LARGE 0.75; month2 identical -> delta 0.0
    month2 = [r for r in rows if r["month"] == max(by_month)]
    assert all(r["share_delta"] == 0.0 for r in month2)
