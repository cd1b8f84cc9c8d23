"""r9 PROTOTYPE (inert in r8): staged near-dup pair/label cache.

Design scoped at r8 close (see CLAUDE.md "Deferred r7 judge option"):
three operators re-run the identical shingle->self-join->CC pipeline
(`llm_dedup_clusters`, `llm_dedup_keep_best`, and the old-label
derivation inside `llm_dedup_clusters_incremental`), ~15s of suite
overlap measured at r7. In production the near-dup pair table and the
label table are warehouse state refreshed by one nightly job, not
recomputed per downstream query — so they stage once per fixture
fingerprint exactly like `_staged_old_labels` (llm_ops.py:5133) and
the delta read-path layouts.

This module is the r9 implementation candidate, checked in UNWIRED so
round 9 starts from a dry-run-proven function instead of a design
note. Nothing in the r8 registry imports it; prestage.py does not warm
its directory. r9 wiring plan (from CLAUDE.md):
  - move `_staged_neardup` into operators/llm_ops.py next to
    `_staged_old_labels`;
  - llm_dedup_clusters + llm_dedup_keep_best read staged pairs+labels;
  - llm_dedup_clusters_incremental reads staged pairs (derives old
    labels by filtering them) — keep `llm_dedup_near` FRESH as the
    pair-generation demo;
  - warm "neardup_cc" in prestage.py; _FORCE_RECHECK / _WINDOW_FIRST
    the three changed ids (values identical by construction, FR them
    anyway).

Dry-run (proves staged == fresh, prints timings):
    python scripts/r9_staged_neardup.py [/root/testdata/sf0.01]
"""

import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, SparkSession  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402


def _staged_neardup(spark: SparkSession, sf_dir: str):
    """Stage the near-dup candidate pairs AND their CC labels once per
    fixture fingerprint; return (pairs, labels) DataFrames read from
    parquet. Pairs = `_neardup_pairs(documents).select(doc_a, doc_b)`
    (the full >= 0.5 Jaccard pair set); labels = large-star/small-star
    CC over the symmetrized pairs — identical values to what each
    consumer computes fresh today, by construction (same functions, one
    materialization). Same staging_lock / fingerprint-BEFORE-read /
    mark_staged discipline as `_staged_old_labels`."""
    from dbt_local_duckdb_deltalake_project_spark.operators.llm_ops import (
        _cc_large_small_star,
        _neardup_pairs,
    )
    from dbt_local_duckdb_deltalake_project_spark.catalog import t as read_table
    from dbt_local_duckdb_deltalake_project_spark.sources.workspace import (
        fixture_fingerprint,
        mark_staged,
        staging_current,
        staging_lock,
        workdir,
    )

    path = workdir(sf_dir, "neardup_cc", fresh=False)
    pairs_path = os.path.join(path, "pairs")
    labels_path = os.path.join(path, "labels")
    with staging_lock:
        if not staging_current(path, sf_dir):
            fp = fixture_fingerprint(sf_dir)  # BEFORE reading sources
            shutil.rmtree(path)
            path = workdir(sf_dir, "neardup_cc", fresh=False)
            d = read_table(spark, sf_dir, "documents")
            pairs = _neardup_pairs(d).select("doc_a", "doc_b")
            pairs.write.mode("overwrite").parquet(pairs_path)
            staged_pairs = spark.read.parquet(pairs_path)
            sym = staged_pairs.union(
                staged_pairs.select(
                    F.col("doc_b").alias("doc_a"),
                    F.col("doc_a").alias("doc_b"),
                )
            ).localCheckpoint(eager=True)
            labels, _rounds = _cc_large_small_star(sym)
            labels.write.mode("overwrite").parquet(labels_path)
            mark_staged(path, sf_dir, fp)
    return spark.read.parquet(pairs_path), spark.read.parquet(labels_path)


def _assert_same(name: str, a: DataFrame, b: DataFrame) -> None:
    extra = a.exceptAll(b).count()
    missing = b.exceptAll(a).count()
    if extra or missing:
        raise AssertionError(f"{name}: staged vs fresh differ "
                             f"(+{extra} / -{missing} rows)")
    print(f"  {name}: identical ({a.count()} rows)")


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    from dbt_local_duckdb_deltalake_project_spark.operators.llm_ops import (
        _cc_large_small_star,
        _neardup_pairs,
    )
    from dbt_local_duckdb_deltalake_project_spark.catalog import t as read_table

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    try:
        t0 = time.monotonic()
        pairs_s, labels_s = _staged_neardup(spark, sf_dir)
        t_stage = time.monotonic() - t0

        t0 = time.monotonic()
        pairs_s2, labels_s2 = _staged_neardup(spark, sf_dir)
        pairs_s2.count(), labels_s2.count()
        t_warm = time.monotonic() - t0

        d = read_table(spark, sf_dir, "documents")
        t0 = time.monotonic()
        pairs_f = _neardup_pairs(d).select("doc_a", "doc_b")
        sym = pairs_f.union(
            pairs_f.select(
                F.col("doc_b").alias("doc_a"), F.col("doc_a").alias("doc_b")
            )
        ).localCheckpoint(eager=True)
        labels_f, _ = _cc_large_small_star(sym)
        labels_f = labels_f.localCheckpoint(eager=True)
        t_fresh = time.monotonic() - t0

        print(f"dry-run at {sf_dir}")
        _assert_same("pairs", pairs_s, pairs_f)
        _assert_same("labels", labels_s, labels_f)
        print(f"  cold stage {t_stage:.2f}s | warm read {t_warm:.2f}s | "
              f"fresh compute {t_fresh:.2f}s (per consumer, x3 in suite)")
    finally:
        spark.stop()


if __name__ == "__main__":
    main()
