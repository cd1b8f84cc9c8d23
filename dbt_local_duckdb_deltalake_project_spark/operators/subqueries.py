"""SURVEY.md §2.7 — subqueries, CTEs, inline VALUES.

Where the SQL is pure ANSI we run the *same text* through Spark SQL and
the DuckDB oracle — one source of truth, zero drift. Catalyst decorrelates
the subqueries (RewriteCorrelatedScalarSubquery / RewritePredicateSubquery)
into joins, so these stay shuffle-planned and scale like the §2.3 joins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..catalog import sql
from .registry import register


def _shared(qid: str, text: str):
    """Register a query whose Spark SQL and DuckDB oracle are identical."""

    @register(qid, text)
    def _q(spark: SparkSession, sf_dir: str, _text: str = text) -> DataFrame:
        return sql(spark, sf_dir, _text)

    _q.__name__ = qid
    return _q


_shared(
    "cte_chain",
    """
    WITH recent_orders AS (
      SELECT o_orderkey, o_custkey, o_totalprice
      FROM orders
      WHERE o_orderdate >= TIMESTAMP '1998-01-01'
    ),
    cust_spend AS (
      SELECT o_custkey,
             ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) AS DOUBLE), 2)
               AS spend,
             COUNT(*) AS n_orders
      FROM recent_orders
      GROUP BY o_custkey
    )
    SELECT c_mktsegment,
           COUNT(*) AS n_customers,
           ROUND(CAST(SUM(CAST(spend AS DECIMAL(38,6))) AS DOUBLE), 2)
             AS segment_spend
    FROM cust_spend
    JOIN customer ON c_custkey = o_custkey
    GROUP BY c_mktsegment
    ORDER BY c_mktsegment
    """,
)

_shared(
    "subq_scalar",
    """
    SELECT o_orderkey, o_totalprice
    FROM orders
    WHERE o_totalprice > 1.75 * (
      SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) AS DOUBLE)
             / COUNT(*)
      FROM orders
    )
    """,
)

_shared(
    "subq_in_exists",
    """
    SELECT c_custkey, c_name
    FROM customer
    WHERE c_nationkey IN (
            SELECT n_nationkey FROM nation WHERE n_regionkey IN (0, 2))
      AND EXISTS (
            SELECT 1 FROM orders
            WHERE o_custkey = c_custkey AND o_orderstatus = 'O')
    """,
)

_shared(
    "subq_correlated_agg",
    """
    SELECT l_orderkey, l_partkey, l_quantity
    FROM lineitem l1
    WHERE l_quantity > 1.8 * (
      SELECT CAST(SUM(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE) / COUNT(*)
      FROM lineitem l2
      WHERE l2.l_partkey = l1.l_partkey
    )
    """,
)

_shared(
    "values_inline",
    """
    SELECT t.code, t.label, COUNT(o_orderkey) AS n_orders
    FROM (VALUES ('F', 'finished'), ('O', 'open'), ('P', 'pending'))
         AS t(code, label)
    LEFT JOIN orders ON o_orderstatus = t.code
    GROUP BY t.code, t.label
    ORDER BY t.code
    """,
)


_shared(
    "join_lateral",
    """
    SELECT c.c_custkey, o.o_orderkey, o.o_totalprice
    FROM customer c, LATERAL (
      SELECT o_orderkey, o_totalprice FROM orders
      WHERE o_custkey = c.c_custkey
      ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 1
    ) o
    """,
)
# join_lateral: correlated per-row subquery (top-1 order per customer).
# Catalyst decorrelates the LATERAL into a ranked window join — same
# plan family as win_topk_per_group, so it scales as one shuffle on the
# correlation key rather than a per-row probe loop.


_shared(
    "cte_recursive",
    # Recursive CTE (Spark 4 WITH RECURSIVE): generate the 80-month spine
    # bounded by the fixture's order-date range, then left-join monthly
    # aggregates — the canonical "fill calendar gaps" pattern that a
    # sequence()/explode spine (agg_date_spine) expresses without
    # recursion. Recursion depth = months, driver-side rounds are
    # bounded and data-independent; each round is a 1-row union, so this
    # scales with the calendar, not the fact table.
    #
    # NOTE: Spark 4.1 recursive CTEs support UNION ALL only
    # (UNION_NOT_SUPPORTED_IN_RECURSIVE_CTE), so a cyclic-graph
    # transitive closure (llm_dedup_clusters' oracle form) is NOT yet
    # expressible — the iterative min-label propagation there remains
    # the Spark-side implementation.
    """
    WITH RECURSIVE months(month_start) AS (
      SELECT CAST('1995-01-01' AS TIMESTAMP) AS month_start
      UNION ALL
      SELECT CAST(month_start + INTERVAL 1 MONTH AS TIMESTAMP)
      FROM months WHERE month_start < CAST('2001-08-01' AS TIMESTAMP)
    ),
    mo AS (
      SELECT date_trunc('month', o_orderdate) AS m,
             COUNT(*) AS n_orders,
             ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) AS DOUBLE), 2)
               AS revenue
      FROM orders GROUP BY 1
    )
    SELECT months.month_start,
           COALESCE(n_orders, 0) AS n_orders,
           COALESCE(revenue, 0.0) AS revenue
    FROM months LEFT JOIN mo ON months.month_start = mo.m
    ORDER BY months.month_start
    """,
)
