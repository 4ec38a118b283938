"""Property tests for the decision-support pack: random tiny relational
inputs → operator result must equal a brute-force Python replica. These
cover input shapes the fixed testdata never hits (empty groups, all-late
orders, single-customer skew)."""

from __future__ import annotations

import datetime

import pathlib
import tempfile

import pyarrow as pa
import pyarrow.parquet as pq
from hypothesis import given, settings
from hypothesis import strategies as st

from us_flight_bigdata_dashboard_spark.operators import decision

T0 = datetime.datetime(1997, 1, 1)
PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]


def _write(tmp_path, name, cols):
    pq.write_table(pa.table(cols), str(tmp_path / f"{name}.parquet"))


@settings(max_examples=6, deadline=None)
@given(
    n_cust=st.integers(min_value=1, max_value=6),
    orders=st.lists(
        st.tuples(st.integers(min_value=1, max_value=6), st.sampled_from(PRIORITIES)),
        max_size=20,
    ),
)
def test_customer_distribution_matches_replica(spark, n_cust, orders):
    # fresh dir per example (function-scoped fixtures don't reset per example)
    tmp_path = pathlib.Path(tempfile.mkdtemp(prefix="prop_q13_"))
    orders = [(c, p) for c, p in orders if c <= n_cust]
    _write(tmp_path, "customer", {"c_custkey": pa.array(range(1, n_cust + 1), pa.int64())})
    _write(
        tmp_path,
        "orders",
        {
            "o_orderkey": pa.array(range(1, len(orders) + 1), pa.int64()),
            "o_custkey": pa.array([c for c, _ in orders], pa.int64()),
            "o_orderpriority": pa.array([p for _, p in orders], pa.string()),
        },
    )
    per_cust = {c: 0 for c in range(1, n_cust + 1)}
    for c, p in orders:
        if p != decision.Q13_EXCLUDED_PRIORITY:
            per_cust[c] += 1
    want: dict[int, int] = {}
    for cnt in per_cust.values():
        want[cnt] = want.get(cnt, 0) + 1
    got = {
        r["c_count"]: r["custdist"]
        for r in decision.q_customer_order_distribution(spark, str(tmp_path)).collect()
    }
    assert got == want


@settings(max_examples=6, deadline=None)
@given(
    lines=st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=5),   # orderkey
            st.integers(min_value=1, max_value=4),   # suppkey
            st.integers(min_value=0, max_value=200), # ship delay days
        ),
        min_size=1,
        max_size=25,
    ),
    statuses=st.lists(st.sampled_from(["F", "O", "P"]), min_size=5, max_size=5),
)
def test_waiting_suppliers_matches_replica(spark, lines, statuses):
    tmp_path = pathlib.Path(tempfile.mkdtemp(prefix="prop_q21_"))
    _write(
        tmp_path,
        "orders",
        {
            "o_orderkey": pa.array(range(1, 6), pa.int64()),
            "o_orderdate": pa.array([T0] * 5, pa.timestamp("us")),
            "o_orderstatus": pa.array(statuses, pa.string()),
        },
    )
    _write(
        tmp_path,
        "lineitem",
        {
            "l_orderkey": pa.array([o for o, _, _ in lines], pa.int64()),
            "l_suppkey": pa.array([s for _, s, _ in lines], pa.int64()),
            "l_shipdate": pa.array(
                [T0 + datetime.timedelta(days=d) for _, _, d in lines],
                pa.timestamp("us"),
            ),
        },
    )
    _write(
        tmp_path,
        "supplier",
        {
            "s_suppkey": pa.array(range(1, 5), pa.int64()),
            "s_name": pa.array([f"S{i}" for i in range(1, 5)], pa.string()),
            "s_nationkey": pa.array([0] * 4, pa.int64()),
        },
    )
    _write(
        tmp_path,
        "nation",
        {
            "n_nationkey": pa.array([0], pa.int64()),
            "n_name": pa.array(["N0"], pa.string()),
            "n_regionkey": pa.array([0], pa.int64()),
        },
    )
    _write(
        tmp_path,
        "region",
        {
            "r_regionkey": pa.array([0], pa.int64()),
            "r_name": pa.array([decision.Q21_REGION], pa.string()),
        },
    )

    numwait: dict[int, int] = {}
    for o in range(1, 6):
        if statuses[o - 1] != "F":
            continue
        supps = {s for ok, s, _ in lines if ok == o}
        late = {s for ok, s, d in lines if ok == o and d > decision.Q21_LATE_DAYS}
        if len(supps) > 1 and len(late) == 1:
            (s,) = late
            numwait[s] = numwait.get(s, 0) + 1
    want = sorted(
        ((f"S{s}", n) for s, n in numwait.items()), key=lambda t: (-t[1], t[0])
    )[: decision.Q21_TOP]
    got = [
        (r["s_name"], r["numwait"])
        for r in decision.q_waiting_suppliers(spark, str(tmp_path)).collect()
    ]
    assert got == want


@settings(max_examples=6, deadline=None)
@given(
    vals=st.lists(
        st.sampled_from([1.0, 2.0, 3.0, 5.0, 8.0]), min_size=1, max_size=30
    ),
)
def test_group_mode_matches_replica(spark, vals):
    """group_mode == the Python (count desc, value asc) argmax on random
    multisets — including all-tied and single-value inputs."""
    from us_flight_bigdata_dashboard_spark.operators.breadth import q_group_mode

    tmp_path = pathlib.Path(tempfile.mkdtemp(prefix="prop_mode_"))
    _write(
        tmp_path,
        "lineitem",
        {
            "l_returnflag": pa.array(["A"] * len(vals), pa.string()),
            "l_linestatus": pa.array(["F"] * len(vals), pa.string()),
            "l_quantity": pa.array(vals, pa.float64()),
        },
    )
    counts: dict[float, int] = {}
    for v in vals:
        counts[v] = counts.get(v, 0) + 1
    want = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
    [row] = q_group_mode(spark, str(tmp_path)).collect()
    assert (row["mode_quantity"], row["mode_count"]) == want
