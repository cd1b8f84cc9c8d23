"""r9 PROTOTYPE (inert in r8): staged-cache consumer rewiring check.

Companion to scripts/r9_staged_neardup.py — that script proves the
STAGED pairs/labels equal the fresh computation; this one proves the
proposed r9 CONSUMER BODIES (each reading the staged parquets instead
of re-running the shingle self-join + CC pipeline) produce outputs
identical to the LIVE registry operators:

  - llm_dedup_clusters   <- staged labels + window size/canonical
  - llm_dedup_keep_best  <- staged labels + n_chars join + rank-1
  - llm_dedup_clusters_incremental <- staged PAIRS filtered for
    new-touching edges (old labels still from _staged_old_labels,
    whose own staging r9 can also derive by filtering staged pairs —
    same values by construction since pairs == _neardup_pairs output)

Green runs here mean the r9 wiring is a mechanical substitution with
zero value drift, so its three _WINDOW_FIRST ids should verify on the
first driver pass. Usage:
    python scripts/r9_wired_consumers.py [/root/testdata/sf0.01]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession  # noqa: E402
from pyspark.sql import Window as W  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from scripts.r9_staged_neardup import _assert_same, _staged_neardup  # noqa: E402


def wired_clusters(spark, sf_dir):
    _pairs, labels = _staged_neardup(spark, sf_dir)
    size_w = W.partitionBy("label")
    return (
        labels.select(
            "doc_id",
            F.col("label").alias("cluster_id"),
            F.count(F.lit(1)).over(size_w).cast("long").alias("cluster_size"),
            (F.col("doc_id") == F.col("label")).alias("is_canonical"),
        )
        .orderBy("doc_id")
    )


def wired_keep_best(spark, sf_dir):
    from dbt_local_duckdb_deltalake_project_spark.catalog import t

    _pairs, labels = _staged_neardup(spark, sf_dir)
    d = t(spark, sf_dir, "documents")
    scored = labels.join(d.select("doc_id", "n_chars"), "doc_id")
    rk = F.row_number().over(
        W.partitionBy("label").orderBy(
            F.col("n_chars").desc(), F.col("doc_id").asc()
        )
    )
    return (
        scored.select(
            "doc_id",
            F.col("label").alias("cluster_id"),
            F.col("n_chars").cast("long").alias("n_chars"),
            (rk == 1).alias("is_kept"),
        )
        .orderBy("doc_id")
    )


def wired_incremental(spark, sf_dir):
    from dbt_local_duckdb_deltalake_project_spark.operators.llm_ops import (
        _cc_large_small_star,
        _staged_old_labels,
    )

    pairs, _labels = _staged_neardup(spark, sf_dir)
    new_pairs = pairs.filter(
        (F.col("doc_a") % 5 == 0) | (F.col("doc_b") % 5 == 0)
    )
    labels_old = _staged_old_labels(spark, sf_dir)
    stars = labels_old.filter(F.col("doc_id") != F.col("label")).select(
        F.col("doc_id").alias("doc_a"), F.col("label").alias("doc_b")
    )
    inc = stars.union(new_pairs)
    sym_inc = inc.union(
        inc.select(
            F.col("doc_b").alias("doc_a"), F.col("doc_a").alias("doc_b")
        )
    ).localCheckpoint(eager=True)
    labels, _ = _cc_large_small_star(sym_inc)
    size_w = W.partitionBy("label")
    return (
        labels.select(
            "doc_id",
            F.col("label").alias("cluster_id"),
            F.count(F.lit(1)).over(size_w).cast("long").alias("cluster_size"),
            (F.col("doc_id") == F.col("label")).alias("is_canonical"),
        )
        .orderBy("doc_id")
    )


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    from dbt_local_duckdb_deltalake_project_spark.operators.llm_ops import (
        llm_dedup_clusters,
        llm_dedup_clusters_incremental,
        llm_dedup_keep_best,
    )

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    try:
        print(f"rewired-consumer differential at {sf_dir}")
        _assert_same(
            "llm_dedup_clusters",
            wired_clusters(spark, sf_dir),
            llm_dedup_clusters(spark, sf_dir),
        )
        _assert_same(
            "llm_dedup_keep_best",
            wired_keep_best(spark, sf_dir),
            llm_dedup_keep_best(spark, sf_dir),
        )
        _assert_same(
            "llm_dedup_clusters_incremental",
            wired_incremental(spark, sf_dir),
            llm_dedup_clusters_incremental(spark, sf_dir),
        )
    finally:
        spark.stop()


if __name__ == "__main__":
    main()
