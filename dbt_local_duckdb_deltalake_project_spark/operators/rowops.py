"""SURVEY.md §2.2 — projection, filter, and row-level operators.

These are pushdown-eligible: every filter/projection here must reach the
parquet scan (PushedFilters / ReadSchema in explain()) — asserted in
tests/test_plans.py. At 100 TB these operators are I/O-bound; correctness
of pushdown IS the performance story.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..catalog import t
from .registry import register


@register(
    "project_select",
    """
    SELECT o_orderkey,
           o_totalprice AS price,
           ROUND(o_totalprice * 1.07, 2) AS price_with_tax,
           UPPER(o_orderpriority) AS priority
    FROM orders
    """,
)
def project_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Per-row double arithmetic is IEEE-deterministic — no decimal detour
    # needed outside aggregations.
    return t(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.col("o_totalprice").alias("price"),
        F.round(F.col("o_totalprice") * 1.07, 2).alias("price_with_tax"),
        F.upper("o_orderpriority").alias("priority"),
    )


@register(
    "project_case_when",
    """
    SELECT o_orderkey,
           CASE WHEN o_totalprice >= 200000 THEN 'large'
                WHEN o_totalprice >= 50000  THEN 'medium'
                ELSE 'small' END AS size_band,
           CASE o_orderstatus WHEN 'F' THEN 'finished'
                              WHEN 'O' THEN 'open'
                              ELSE 'pending' END AS status_label
    FROM orders
    """,
)
def project_case_when(spark: SparkSession, sf_dir: str) -> DataFrame:
    price = F.col("o_totalprice")
    return t(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.when(price >= 200000, "large")
        .when(price >= 50000, "medium")
        .otherwise("small")
        .alias("size_band"),
        F.when(F.col("o_orderstatus") == "F", "finished")
        .when(F.col("o_orderstatus") == "O", "open")
        .otherwise("pending")
        .alias("status_label"),
    )


@register(
    "filter_compound",
    """
    SELECT l_orderkey, l_linenumber, l_quantity, l_discount, l_returnflag
    FROM lineitem
    WHERE (l_quantity > 30 AND l_discount < 0.03)
       OR (l_returnflag = 'R' AND NOT l_linestatus = 'F')
    """,
)
def filter_compound(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    return li.filter(
        ((F.col("l_quantity") > 30) & (F.col("l_discount") < 0.03))
        | ((F.col("l_returnflag") == "R") & ~(F.col("l_linestatus") == "F"))
    ).select("l_orderkey", "l_linenumber", "l_quantity", "l_discount", "l_returnflag")


@register(
    "filter_in_between_like",
    """
    SELECT o_orderkey, o_orderpriority, o_totalprice
    FROM orders
    WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')
      AND o_totalprice BETWEEN 10000 AND 150000
      AND o_orderstatus LIKE 'F%'
      AND o_custkey IS NOT NULL
    """,
)
def filter_in_between_like(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = t(spark, sf_dir, "orders")
    return o.filter(
        F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
        & F.col("o_totalprice").between(10000, 150000)
        & F.col("o_orderstatus").like("F%")
        & F.col("o_custkey").isNotNull()
    ).select("o_orderkey", "o_orderpriority", "o_totalprice")


@register(
    "distinct_rows",
    "SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem",
)
def distinct_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    # distinct = shuffle on all columns; here 6 combinations → map-side
    # partial dedup makes the shuffle negligible at any scale.
    return t(spark, sf_dir, "lineitem").select("l_returnflag", "l_linestatus").distinct()


@register(
    "dedup_keep_latest",
    """
    SELECT user_id, event_type, event_id AS latest_event, ts AS latest_ts
    FROM (
      SELECT user_id, event_type, event_id, ts,
             ROW_NUMBER() OVER (
               PARTITION BY user_id, event_type
               ORDER BY ts DESC, event_id DESC) AS rn
      FROM events
    ) WHERE rn = 1
    """,
)
def dedup_keep_latest(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Silver-layer conform: one row per key, latest wins, event_id breaks
    # ts ties deterministically. Single shuffle on the dedup key; at
    # 100 TB pre-partition bronze by the same key to skip the shuffle.
    w = W.partitionBy("user_id", "event_type").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    return (
        t(spark, sf_dir, "events")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            "event_type",
            F.col("event_id").alias("latest_event"),
            F.col("ts").alias("latest_ts"),
        )
    )


@register(
    "null_handling",
    """
    SELECT e.user_id,
           COALESCE(NULLIF(e.event_type, 'error'), 'unknown') AS clean_type,
           COALESCE(e.value, 0.0) AS value_or_zero,
           (e.value IS NOT DISTINCT FROM e.value) AS self_eq
    FROM events e
    """,
)
def null_handling(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = t(spark, sf_dir, "events")
    return e.select(
        "user_id",
        F.coalesce(F.nullif(F.col("event_type"), F.lit("error")), F.lit("unknown")).alias(
            "clean_type"
        ),
        F.coalesce(F.col("value"), F.lit(0.0)).alias("value_or_zero"),
        # the self-comparison IS the declared semantic (IS NOT DISTINCT
        # FROM x = x is true even for NULL); PySpark logs a benign
        # "trivially true equals predicate" warning for it at plan time
        F.col("value").eqNullSafe(F.col("value")).alias("self_eq"),
    )


@register(
    "cast_types",
    """
    SELECT l_orderkey,
           CAST(l_linenumber AS BIGINT) AS line_big,
           CAST(FLOOR(l_extendedprice) AS BIGINT) AS price_floor,
           CAST(l_quantity AS VARCHAR) AS qty_str,
           CAST(CAST(l_shipdate AS DATE) AS TIMESTAMP) AS ship_day,
           CAST('42' AS INTEGER) AS parsed_int
    FROM lineitem
    """,
)
def cast_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    # double→int casts diverge across engines (Spark truncates, DuckDB
    # rounds) — FLOOR first on both sides sidesteps it (SURVEY.md §7.4).
    li = t(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        F.col("l_linenumber").cast("bigint").alias("line_big"),
        F.floor("l_extendedprice").cast("bigint").alias("price_floor"),
        F.col("l_quantity").cast("string").alias("qty_str"),
        F.col("l_shipdate").cast("date").cast("timestamp").alias("ship_day"),
        F.lit("42").cast("int").alias("parsed_int"),
    )


@register(
    "sample_rows",
    """
    SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
    FROM lineitem
    WHERE substr(md5(CAST(l_orderkey AS VARCHAR) || '-'
                     || CAST(l_linenumber AS VARCHAR)), 1, 1) < '2'
    """,
)
def sample_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Deterministic hash-Bernoulli sample (~2/16 = 12.5%): md5 of the row
    # key is engine-independent, so the same rows are selected in any
    # engine — unlike seeded RNG samplers. Embarrassingly parallel, no
    # shuffle, and the filter stays in codegen.
    key = F.concat_ws(
        "-",
        F.col("l_orderkey").cast("string"),
        F.col("l_linenumber").cast("string"),
    )
    return (
        t(spark, sf_dir, "lineitem")
        .where(F.substring(F.md5(key), 1, 1) < "2")
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")
    )
