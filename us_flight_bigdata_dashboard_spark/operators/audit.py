"""Data-quality audit: constraint checking as a first-class engine operator.

The reference relies on MySQL DDL constraints (PRIMARY KEY on the star dims,
`sql/data_modeling.sql`) to fail loudly on bad data; a lakehouse has no
enforced constraints, so the engine must *measure* them. This operator runs
the standard audit suite — key uniqueness, referential integrity, domain
ranges, null/blank rates — and returns one row per check with violation
counts, the shape a nightly data-contract job alerts on.

Scale shape: each check is a full-scan aggregate with map-side combine
(bytes, not rows, shuffle); the referential-integrity check is a left anti
join on the foreign key (sort-merge at 100 TB, broadcast when the parent
side is dimension-sized). The checks union into one result after each has
already been reduced to a single row, so the union is free. No check
collects or iterates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from us_flight_bigdata_dashboard_spark.sources.catalog import load_table

QTY_LO, QTY_HI = 1.0, 50.0


def _check(df: DataFrame, name: str, violation) -> DataFrame:
    return df.agg(
        F.lit(name).alias("check_name"),
        F.count(F.lit(1)).alias("n_checked"),
        F.sum(F.when(violation, 1).otherwise(0)).alias("n_violations"),
    )


def q_dq_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audit suite over the TPC-H-ish tables: one row per data contract."""
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    lineitem = load_table(spark, sf_dir, "lineitem")
    docs = load_table(spark, sf_dir, "documents")

    # PK uniqueness: count(*) - count(distinct key), computed as one agg
    pk = orders.agg(
        F.lit("orders_pk_unique").alias("check_name"),
        F.count(F.lit(1)).alias("n_checked"),
        (F.count(F.lit(1)) - F.countDistinct("o_orderkey")).alias("n_violations"),
    )
    # FK integrity: orders whose custkey has no parent row
    orphans = (
        orders.join(customer, orders["o_custkey"] == customer["c_custkey"], "left_anti")
        .agg(F.count(F.lit(1)).alias("n_orphans"))
        .select(
            F.lit("orders_custkey_fk").alias("check_name"),
            F.lit(None).cast("long").alias("n_checked"),
            F.col("n_orphans").alias("n_violations"),
        )
    )
    # count the FK base separately (the anti join discards the non-orphans)
    fk_base = orders.agg(F.count(F.lit(1)).alias("n"))
    orphans = orphans.crossJoin(fk_base).select(
        "check_name", F.col("n").alias("n_checked"), "n_violations"
    )
    qty = _check(
        lineitem,
        "lineitem_qty_range",
        (F.col("l_quantity") < QTY_LO) | (F.col("l_quantity") > QTY_HI),
    )
    blank = _check(
        docs,
        "documents_nonblank",
        F.col("text").isNull() | (F.length(F.trim(F.col("text"))) == 0),
    )
    return pk.unionByName(orphans).unionByName(qty).unionByName(blank)


_ORACLE_DQ_AUDIT = f"""
SELECT 'orders_pk_unique' AS check_name,
       COUNT(*) AS n_checked,
       COUNT(*) - COUNT(DISTINCT o_orderkey) AS n_violations
FROM orders
UNION ALL
SELECT 'orders_custkey_fk',
       (SELECT COUNT(*) FROM orders),
       (SELECT COUNT(*) FROM orders o
         WHERE NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey))
UNION ALL
SELECT 'lineitem_qty_range', COUNT(*),
       CAST(SUM(CASE WHEN l_quantity < {QTY_LO} OR l_quantity > {QTY_HI} THEN 1 ELSE 0 END) AS BIGINT)
FROM lineitem
UNION ALL
SELECT 'documents_nonblank', COUNT(*),
       CAST(SUM(CASE WHEN text IS NULL OR length(trim(text)) = 0 THEN 1 ELSE 0 END) AS BIGINT)
FROM documents
"""


QUERIES = {
    "dq_audit": q_dq_audit,
}

ORACLE = {
    "dq_audit": _ORACLE_DQ_AUDIT,
}
