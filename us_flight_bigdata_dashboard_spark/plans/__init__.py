from us_flight_bigdata_dashboard_spark.plans.explain import (
    count_bnl_joins,
    count_broadcast_joins,
    count_exchanges,
    count_parquet_scans,
    count_sortmerge_joins,
    plan_str,
    pushed_filters,
    read_schema_columns,
)

__all__ = [
    "count_bnl_joins",
    "count_broadcast_joins",
    "count_exchanges",
    "count_parquet_scans",
    "count_sortmerge_joins",
    "plan_str",
    "pushed_filters",
    "read_schema_columns",
]
