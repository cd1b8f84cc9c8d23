"""r9 PROTOTYPE (inert in r8): win_yoy_growth micros -> cents fix.

The r8 2^53-headroom audit found win_yoy_growth's prev_rev_m (yearly
revenue in scaled-long MICROS, surfaced through lag) at 1.18e15 at
sf0.1 — it scales with SF and would cross 2^53 near sf1, flaking any
future large-SF differential through the fetchdf float64 path (the
driver at sf0.01 is safe forever, ~x750 headroom). Scoped r9 fix
(CLAUDE.md): aggregate cents (x100) instead of micros on BOTH sides
and surface prev_rev_c; revenue and yoy_growth stay BIT-IDENTICAL
because each is a correctly-rounded double quotient of the same exact
rational (rev_m = rev_c * 10^4 exactly while under 2^53, and (a-b)/b
is scale-invariant), so only the lag column's name/scale changes.

This script is the r9 edit candidate, checked in UNWIRED. It runs the
proposed Spark query against the proposed DuckDB oracle with the
driver-sim canonicalizer at a given SF, and additionally checks the
proposed revenue/yoy_growth doubles are bit-identical to the LIVE
registry op's output (proving the r9 edit only rescales the lag
column). Usage:
    python scripts/r9_yoy_cents.py [/root/testdata/sf0.1]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402
from pyspark.sql import SparkSession  # noqa: E402
from pyspark.sql import Window as W  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from scripts.driver_sim import canon  # noqa: E402

YOY_CENTS_ORACLE = """
WITH yearly AS (
  SELECT o_orderpriority,
         CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS yr,
         CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
           AS rev_c
  FROM orders GROUP BY o_orderpriority, EXTRACT(year FROM o_orderdate)
)
SELECT o_orderpriority, yr,
       CAST(rev_c AS DOUBLE) / 100 AS revenue,
       CAST(LAG(rev_c) OVER w AS BIGINT) AS prev_rev_c,
       CASE WHEN LAG(rev_c) OVER w IS NOT NULL
            THEN (CAST(rev_c AS DOUBLE)
                  - CAST(LAG(rev_c) OVER w AS DOUBLE))
                 / CAST(LAG(rev_c) OVER w AS DOUBLE)
       END AS yoy_growth
FROM yearly
WINDOW w AS (PARTITION BY o_orderpriority ORDER BY yr)
ORDER BY o_orderpriority, yr
"""


def win_yoy_growth_cents(spark, sf_dir):
    """Proposed r9 body — identical to windows.py's win_yoy_growth but
    aggregating exact cents, which bounds the lag column at sf-scaled
    1.2e11 (2^53 headroom to ~sf75000)."""
    from dbt_local_duckdb_deltalake_project_spark.catalog import t

    o = t(spark, sf_dir, "orders")
    yearly = o.groupBy(
        "o_orderpriority", F.year("o_orderdate").cast("long").alias("yr")
    ).agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias("rev_c")
    )
    w = W.partitionBy("o_orderpriority").orderBy("yr")
    prev = F.lag("rev_c").over(w)
    return yearly.select(
        "o_orderpriority", "yr",
        (F.col("rev_c").cast("double") / 100).alias("revenue"),
        prev.alias("prev_rev_c"),
        F.when(
            prev.isNotNull(),
            (F.col("rev_c").cast("double") - prev.cast("double"))
            / prev.cast("double"),
        ).alias("yoy_growth"),
    ).orderBy("o_orderpriority", "yr")


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    try:
        df = win_yoy_growth_cents(spark, sf_dir)
        cols = sorted(df.columns)
        rows = sorted(tuple(canon(r[c]) for c in cols) for r in df.collect())

        con = duckdb.connect()
        con.execute(
            "CREATE VIEW orders AS SELECT * FROM "
            f"read_parquet('{sf_dir}/orders.parquet')"
        )
        od = con.execute(YOY_CENTS_ORACLE).fetchdf()
        ocols = sorted(od.columns)
        orows = sorted(
            tuple(canon(v) for v in t_)
            for t_ in od[ocols].itertuples(index=False, name=None)
        )
        assert cols == ocols, f"cols {cols} vs {ocols}"
        assert rows == orows, "spark vs duckdb value mismatch"
        print(f"proposed spark vs proposed oracle: MATCH ({len(rows)} rows)")

        # doubles must be bit-identical to the live op (only the lag
        # column rescales)
        from dbt_local_duckdb_deltalake_project_spark.operators.windows import (
            win_yoy_growth,
        )

        live = {
            (r["o_orderpriority"], r["yr"]): r
            for r in win_yoy_growth(spark, sf_dir).collect()
        }
        n_scaled = 0
        for r in df.collect():
            lv = live[(r["o_orderpriority"], r["yr"])]
            assert lv["revenue"] == r["revenue"], "revenue drifted"
            assert lv["yoy_growth"] == r["yoy_growth"], "yoy drifted"
            if r["prev_rev_c"] is not None:
                assert lv["prev_rev_m"] == r["prev_rev_c"] * 10_000
                n_scaled += 1
        print(f"vs live op: revenue/yoy bit-identical, "
              f"{n_scaled} lag values exactly /10000")
        mx = max(abs(r["prev_rev_c"] or 0) for r in df.collect())
        print(f"max |prev_rev_c| = {mx:.3e} (2^53 = 9.007e15)")
    finally:
        spark.stop()


if __name__ == "__main__":
    main()
