"""Order-independent exact aggregation expressions.

Why: a distributed double-precision SUM depends on partition merge order, so
two engines (or two runs) can disagree in the last ulps. The driver's
correctness gate hash-compares Spark vs DuckDB values exactly, and at 100 TB
(~10^12 rows) naive double sums drift by far more than test noise.

Technique: cast each addend to a fixed-scale DECIMAL before summing. Decimal
sums are integer arithmetic — exact, associative, commutative — so the result
is identical regardless of partitioning, AQE coalescing, or thread count, on
any engine. The final cast back to DOUBLE is a single correctly-rounded
conversion (exact as long as |sum|·10^scale < 2^53).

This replaces the reference's hand-rolled chunked partial/final aggregation
(src/aggregate_flight_data.py:25-37) whose mean-merge is broken (SURVEY.md
quirk Q1) — Spark's partial/final HashAggregate plus decimal addends is both
correct and deterministic.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dsum(c: Column | str, scale: int = 4, precision: int = 28) -> Column:
    """Deterministic sum of a double column: decimal-quantized, exact merge.

    Returns DOUBLE. ``scale`` decimal places of each addend are kept; pick a
    scale fine enough that quantization is below the semantic tolerance of
    the metric (4 is plenty for money/minutes metrics).

    Overflow bound (know it at 100 TB): under Spark's default non-ANSI
    mode an ADDEND whose magnitude exceeds 10^(precision-scale) casts to
    NULL and is silently dropped from the sum — a data problem would yield
    a quietly wrong result, not an error. Defaults give |addend| <
    10^24 and exact final-double conversion while |sum|·10^scale < 2^53
    (|sum| ≲ 9·10^11 at scale 4). For magnitudes anywhere near these,
    raise ``precision``/lower ``scale``, and run with
    ``spark.sql.ansi.enabled=true`` so overflow fails loudly instead.
    """
    col = F.col(c) if isinstance(c, str) else c
    return F.sum(col.cast(f"decimal({precision},{scale})")).cast("double")


def davg(c: Column | str, scale: int = 4, precision: int = 28) -> Column:
    """Deterministic mean: exact decimal sum divided by count (IEEE division
    of two deterministic values — bit-stable across engines)."""
    col = F.col(c) if isinstance(c, str) else c
    return dsum(col, scale, precision) / F.count(col)


def sql_dsum(expr: str, scale: int = 4, precision: int = 28) -> str:
    """ANSI-SQL rendering of ``dsum`` for the DuckDB oracle."""
    return f"CAST(SUM(CAST(({expr}) AS DECIMAL({precision},{scale}))) AS DOUBLE)"


def sql_davg(expr: str, scale: int = 4, precision: int = 28) -> str:
    """ANSI-SQL rendering of ``davg`` for the DuckDB oracle."""
    return f"({sql_dsum(expr, scale, precision)} / COUNT({expr}))"


def fsum(c: Column | str, scale: int = 12) -> Column:
    """FLOOR-quantized deterministic sum — the rounding-mode-insensitive
    variant of ``dsum``. ``dsum`` quantizes addends with a double→DECIMAL
    cast, which Spark rounds HALF_UP and DuckDB half-even: an addend
    landing exactly on a .5·10^-scale boundary diverges by one quantum
    (found in the wild at round 8: embedding_pca_power at sf0.1 — the
    gate showed a 1e-12-relative drift). ``floor`` has no mode: identical
    doubles floor identically everywhere.

    Bounds: |addend|·10^scale must stay < 2^63 (Spark's floor(double)
    returns LONG) and |sum|·10^scale < ~2^53 (DuckDB's wide-DECIMAL →
    double conversion is not correctly rounded past the exact window —
    the round-8 ANOVA lesson). Pick the scale from the addend magnitude
    AND the row count."""
    col = F.col(c) if isinstance(c, str) else c
    q = float(10**scale)
    return (
        F.sum(F.floor(col * F.lit(q)).cast("decimal(38,0)")).cast("double")
        / F.lit(q)
    )


def sql_fsum(expr: str, scale: int = 12) -> str:
    """ANSI-SQL rendering of ``fsum`` for the DuckDB oracle."""
    return (
        f"(CAST(SUM(CAST(FLOOR(({expr}) * 1e{scale}) AS DECIMAL(38,0))) AS DOUBLE)"
        f" / 1e{scale})"
    )
