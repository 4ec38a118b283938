"""Property tests for the exact-aggregation layer: dsum/davg must be
bit-identical across partitionings and equal to an arbitrary-precision
Python oracle — the invariant the whole correctness gate rests on."""

from __future__ import annotations

from decimal import Decimal

from hypothesis import given, settings
from hypothesis import strategies as st

from us_flight_bigdata_dashboard_spark.functions.exact import dsum


def _py_dsum(values: list[float], scale: int = 4) -> float:
    q = Decimal(1).scaleb(-scale)
    total = sum(Decimal(str(0.0) if v is None else repr(v)).quantize(q, rounding="ROUND_HALF_UP") for v in values)
    return float(total)


@settings(max_examples=15, deadline=None)
@given(
    st.lists(
        st.floats(min_value=-1e6, max_value=1e6, allow_nan=False, allow_infinity=False),
        min_size=1,
        max_size=60,
    )
)
def test_dsum_partition_invariant_and_matches_decimal_oracle(spark, values):
    results = []
    for n_parts in (1, 7):
        df = spark.createDataFrame([(v,) for v in values], "v double").repartition(n_parts)
        results.append(df.agg(dsum("v").alias("s")).first()["s"])
    assert results[0] == results[1]  # bit-identical across partitionings
    assert results[0] == _py_dsum(values)  # equals arbitrary-precision oracle


def test_dsum_null_handling(spark):
    df = spark.createDataFrame([(1.5,), (None,), (2.25,)], "v double")
    assert df.agg(dsum("v").alias("s")).first()["s"] == 3.75
