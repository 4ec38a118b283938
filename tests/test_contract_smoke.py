"""Driver-contract smoke: every registered query runs at sf0.001 and every
oracle key has a query. (Full value-level verification lives in
tools/check_oracle.py at sf0.01 — too slow for the unit suite.)"""

from __future__ import annotations

from us_flight_bigdata_dashboard_spark.registry import oracle_sql, queries

SF_DIR = "/root/testdata/sf0.001"


def test_oracle_keys_subset_of_queries():
    qs, os_ = queries(), oracle_sql()
    assert set(os_) <= set(qs)
    # current design: everything is oracle-checkable
    assert set(os_) == set(qs)


def test_all_queries_run_and_have_stable_schema(spark):
    for name, fn in queries().items():
        df = fn(spark, SF_DIR)
        assert df.columns, name
        df.limit(1).collect()  # plan executes


def test_sampled_queries_run_and_have_stable_schema(spark):
    """Fast default-suite representative of the full smoke above (which is
    slow-marked — it runs all 550 queries and takes ~12 min): every 37th
    registry entry, spanning the flagship prefix and all module families
    in stable registry order."""
    items = list(queries().items())
    for name, fn in items[::37]:
        df = fn(spark, SF_DIR)
        assert df.columns, name
        df.limit(1).collect()  # plan executes
