"""SURVEY.md §2.6 — sort, limit, and set operations.

Determinism rule: every LIMIT carries a total order (unique tiebreak
column) — without it the selected rows are partition-order dependent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import t
from .registry import register


@register(
    "sort_multikey",
    """
    SELECT c_custkey, c_mktsegment, c_acctbal,
           CASE WHEN c_acctbal < 0 THEN NULL ELSE c_acctbal END AS bal_or_null
    FROM customer
    ORDER BY c_mktsegment ASC,
             (CASE WHEN c_acctbal < 0 THEN NULL ELSE c_acctbal END)
               DESC NULLS LAST,
             c_custkey ASC
    """,
)
def sort_multikey(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Global sort = range partitioning (sampled boundaries) + local sort;
    # scales linearly. NULLS placement made explicit because engine
    # defaults differ (Spark: nulls first ASC; DuckDB: nulls last).
    c = t(spark, sf_dir, "customer")
    bal_or_null = F.when(F.col("c_acctbal") < 0, None).otherwise(
        F.col("c_acctbal")
    )
    return (
        c.select(
            "c_custkey",
            "c_mktsegment",
            "c_acctbal",
            bal_or_null.alias("bal_or_null"),
        )
        .orderBy(
            F.col("c_mktsegment").asc(),
            F.col("bal_or_null").desc_nulls_last(),
            F.col("c_custkey").asc(),
        )
    )


@register(
    "limit_offset",
    """
    SELECT o_orderkey, o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey ASC
    LIMIT 20 OFFSET 10
    """,
)
def limit_offset(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        t(spark, sf_dir, "orders")
        .select("o_orderkey", "o_totalprice")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .offset(10)
        .limit(20)
    )


@register(
    "topk",
    """
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey ASC
    LIMIT 15
    """,
)
def topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    # orderBy+limit fuses to TakeOrderedAndProject: per-partition top-k
    # then a k-row merge on the driver — O(k) network at any input size.
    return (
        t(spark, sf_dir, "orders")
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .limit(15)
    )


def _status_slices(spark: SparkSession, sf_dir: str) -> tuple[DataFrame, DataFrame]:
    o = t(spark, sf_dir, "orders")
    cols = ["o_custkey", "o_orderpriority"]
    return (
        o.filter(F.col("o_orderstatus") == "F").select(*cols),
        o.filter(F.col("o_totalprice") > 100000).select(*cols),
    )


@register(
    "set_union_all",
    """
    SELECT o_custkey, o_orderpriority FROM orders WHERE o_orderstatus = 'F'
    UNION ALL
    SELECT o_custkey, o_orderpriority FROM orders WHERE o_totalprice > 100000
    """,
)
def set_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    a, b = _status_slices(spark, sf_dir)
    return a.unionByName(b)


@register(
    "set_union",
    """
    SELECT o_custkey, o_orderpriority FROM orders WHERE o_orderstatus = 'F'
    UNION
    SELECT o_custkey, o_orderpriority FROM orders WHERE o_totalprice > 100000
    """,
)
def set_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    a, b = _status_slices(spark, sf_dir)
    return a.unionByName(b).distinct()


@register(
    "set_intersect",
    """
    SELECT o_custkey, o_orderpriority FROM orders WHERE o_orderstatus = 'F'
    INTERSECT
    SELECT o_custkey, o_orderpriority FROM orders WHERE o_totalprice > 100000
    """,
)
def set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    a, b = _status_slices(spark, sf_dir)
    return a.intersect(b)


@register(
    "set_intersect_all",
    """
    SELECT o_custkey, o_orderpriority FROM orders WHERE o_orderstatus = 'F'
    INTERSECT ALL
    SELECT o_custkey, o_orderpriority FROM orders WHERE o_totalprice > 100000
    """,
)
def set_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    a, b = _status_slices(spark, sf_dir)
    return a.intersectAll(b)


@register(
    "set_except",
    """
    SELECT o_custkey, o_orderpriority FROM orders WHERE o_orderstatus = 'F'
    EXCEPT
    SELECT o_custkey, o_orderpriority FROM orders WHERE o_totalprice > 100000
    """,
)
def set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    a, b = _status_slices(spark, sf_dir)
    return a.subtract(b)


@register(
    "set_except_all",
    """
    SELECT o_custkey, o_orderpriority FROM orders WHERE o_orderstatus = 'F'
    EXCEPT ALL
    SELECT o_custkey, o_orderpriority FROM orders WHERE o_totalprice > 100000
    """,
)
def set_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    a, b = _status_slices(spark, sf_dir)
    return a.exceptAll(b)
