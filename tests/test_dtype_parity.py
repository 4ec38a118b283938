"""Pandas-dtype parity between every Spark query and its DuckDB oracle.

Guards the round-5 driver-gate failure class: the driver canonicalizes both
result sets through pandas, where DuckDB renders HUGEINT (SUM over integers)
and DECIMAL results as float64 while Spark keeps int64 / object-Decimal —
equal values then stringify differently ("150000" vs "150000.0") and the
value hash mismatches even though tools/check_oracle.py's exact fetchall()
path passes. All nine red cells in CORRECTNESS_r05.json were this.

The rule enforced here (see tools/dtype_parity.py for the taxonomy): every
oracle's declared DuckDB result type must land in the same pandas dtype
family as the Spark result schema — integer SUMs cast to BIGINT, no DECIMAL
outputs on either engine, no int-vs-float family splits.
"""

from __future__ import annotations

import os
import sys

import duckdb


sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

from dtype_parity import _COMPAT, _DECIMAL, duck_family, spark_family  # noqa: E402

from us_flight_bigdata_dashboard_spark.registry import oracle_sql, queries
from us_flight_bigdata_dashboard_spark.sources.catalog import TABLES

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


def _parity_violations(spark, names):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    qs, oracles = queries(), oracle_sql()
    violations = []
    for name in names:
        fn = qs[name]
        if name not in oracles:
            continue
        sdf = fn(spark, SF_DIR)
        sfam = {f.name: spark_family(f.dataType) for f in sdf.schema.fields}
        rel = con.sql(oracles[name])
        for col, typ in zip(rel.columns, rel.types):
            if col not in sfam:
                continue
            ofam, sf = duck_family(str(typ)), sfam[col]
            if (sf == ofam and sf != _DECIMAL) or (sf, ofam) in _COMPAT:
                continue
            violations.append(f"{name}.{col}: spark={sf} duckdb={ofam}")
    return violations


def test_dtype_parity_full_matrix(spark):
    violations = _parity_violations(spark, list(queries()))
    assert not violations, "\n".join(violations)


def test_dtype_parity_sampled(spark):
    """Fast default-suite representative of the full matrix above (which is
    slow-marked — ~8 min over 550 entries): every 23rd registry entry in
    stable order, spanning the flagship prefix and every module family."""
    violations = _parity_violations(spark, list(queries())[::23])
    assert not violations, "\n".join(violations)
