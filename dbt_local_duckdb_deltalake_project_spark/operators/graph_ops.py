"""Graph analytics over relational data (SURVEY.md §2 extensions).

The customer–supplier bipartite graph implied by order lineitems is the
fixture's natural graph: who buys from whom. `llm_dedup_clusters`
(llm_ops.py) already covers variable-round connected components with
convergence checks; this module adds the fixed-round iterative pattern —
PageRank with the iteration count in the plan, every pass a join + an
aggregation on the node key, no driver-side graph state.

Determinism discipline: ranks live as scaled-long micros and every
division is integer floor division (positive operands, so Spark's
truncating DIV and DuckDB's flooring // agree) — the llm_kmeans route.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import t
from .registry import register

_PAGERANK_ORACLE = """
WITH pairs AS (
  SELECT DISTINCT 'c:' || CAST(o_custkey AS VARCHAR) AS c,
                  's:' || CAST(l_suppkey AS VARCHAR) AS s
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
),
edges AS (
  SELECT c AS src, s AS dst FROM pairs
  UNION ALL
  SELECT s AS src, c AS dst FROM pairs
),
deg AS (SELECT src, COUNT(*) AS outdeg FROM edges GROUP BY src),
r0 AS (SELECT src AS node, CAST(1000000 AS BIGINT) AS r FROM deg),
i1 AS (
  SELECT e.dst AS node,
         CAST(150000 + (85 * SUM(r.r // d.outdeg)) // 100 AS BIGINT) AS r
  FROM edges e
  JOIN deg d ON e.src = d.src
  JOIN r0 r ON r.node = e.src
  GROUP BY e.dst
),
i2 AS (
  SELECT e.dst AS node,
         CAST(150000 + (85 * SUM(r.r // d.outdeg)) // 100 AS BIGINT) AS r
  FROM edges e
  JOIN deg d ON e.src = d.src
  JOIN i1 r ON r.node = e.src
  GROUP BY e.dst
),
i3 AS (
  SELECT e.dst AS node,
         CAST(150000 + (85 * SUM(r.r // d.outdeg)) // 100 AS BIGINT) AS r
  FROM edges e
  JOIN deg d ON e.src = d.src
  JOIN i2 r ON r.node = e.src
  GROUP BY e.dst
)
SELECT node, r AS rank_micros FROM i3 ORDER BY node
"""


@register("graph_pagerank", _PAGERANK_ORACLE)
def graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank (damping 0.85, 3 unrolled iterations) over the undirected
    customer–supplier purchase graph. Each iteration is exactly one
    join (ranks reach their out-edges on the src key) and one
    aggregation (inflow sums on the dst key) — the textbook distributed
    formulation: rank state never leaves the cluster, no collect, no
    driver loop state, and partial aggregation combines inflow map-side
    before the dst shuffle. Because the edge list is reused every
    round, at 100 TB you persist it partitioned by src (one staging
    shuffle amortized over all iterations, the same discipline as
    join_bucketed_colocated); skewed hub nodes are bounded by AQE skew
    splitting on the inflow shuffle. Ranks are scaled-long micros with
    floor division on positive operands, so Spark DIV and DuckDB //
    produce bit-identical integers — no float mass accumulation to
    drift between engines (fixed iteration count makes the whole
    computation one Catalyst plan; a convergence-checked variant is
    `llm_dedup_clusters`' loop pattern).
    """
    o = t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    l = t(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    pairs = (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .select(
            F.concat(F.lit("c:"), F.col("o_custkey").cast("string"))
            .alias("c"),
            F.concat(F.lit("s:"), F.col("l_suppkey").cast("string"))
            .alias("s"),
        )
        .distinct()
    )
    edges = pairs.select(
        F.col("c").alias("src"), F.col("s").alias("dst")
    ).unionAll(pairs.select(F.col("s").alias("src"), F.col("c").alias("dst")))
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
    edges_deg = edges.join(deg, "src")
    ranks = deg.select(
        F.col("src").alias("node"), F.lit(1_000_000).cast("long").alias("r")
    )
    for _ in range(3):
        ranks = (
            edges_deg.join(ranks, edges_deg.src == ranks.node)
            .select(
                F.col("dst"), F.expr("r DIV outdeg").alias("contrib")
            )
            .groupBy("dst")
            .agg(
                (
                    F.lit(150_000)
                    + F.expr("85 * sum(contrib) DIV 100")
                ).cast("long").alias("r")
            )
            .withColumnRenamed("dst", "node")
        )
    return ranks.select("node", F.col("r").alias("rank_micros")).orderBy(
        "node"
    )
