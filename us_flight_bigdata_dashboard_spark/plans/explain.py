"""Physical-plan introspection helpers.

The 100 TB design contract is enforced here, not hoped for: tests assert
that dim joins broadcast (no fact shuffle), filters and projections reach
the parquet scan (PushedFilters / ReadSchema), and shuffle counts stay at
the theoretical minimum. If a refactor regresses a plan (e.g. a join flips
to sort-merge-with-shuffle or a filter stops pushing), the plan tests fail
even though results stay correct.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def plan_str(df: DataFrame, mode: str = "formatted") -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), mode)  # type: ignore[attr-defined]


def _count_op(df: DataFrame, op: str) -> int:
    """Count physical operators by their unique '(N) Op' detail headers —
    the formatted plan prints every operator twice (tree + details)."""
    return len(re.findall(rf"\(\d+\) {op}\b", plan_str(df)))


def count_broadcast_joins(df: DataFrame) -> int:
    return _count_op(df, "BroadcastHashJoin")


def count_sortmerge_joins(df: DataFrame) -> int:
    return _count_op(df, "SortMergeJoin")


def count_bnl_joins(df: DataFrame) -> int:
    return _count_op(df, "BroadcastNestedLoopJoin")


def count_parquet_scans(df: DataFrame) -> int:
    return _count_op(df, "Scan parquet")


def count_exchanges(df: DataFrame) -> int:
    """Shuffle exchanges only — the '(N) Exchange' header never matches
    BroadcastExchange (different op name), so no subtraction is needed."""
    return _count_op(df, "Exchange")


def pushed_filters(df: DataFrame) -> list[str]:
    """All PushedFilters entries across scans in the formatted plan."""
    out: list[str] = []
    for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", plan_str(df)):
        if m.group(1).strip():
            out.extend(s.strip() for s in m.group(1).split(","))
    return out


def read_schema_columns(df: DataFrame) -> list[set[str]]:
    """Column sets actually read by each parquet scan (column pruning
    evidence)."""
    out: list[set[str]] = []
    for m in re.finditer(r"ReadSchema: struct<([^>]*)>", plan_str(df)):
        cols = {c.split(":")[0].strip() for c in m.group(1).split(",") if c.strip()}
        out.append(cols)
    return out
