#!/usr/bin/env python
"""Benchmark harness (driver contract + BASELINE.md procedure).

Runs every registered query from ``__spark_entry__.queries()`` at
``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]``. The LAST line printed is one compact JSON
headline (no per-query dicts, so a tail-truncating reader always sees
the numbers that matter):

    {"metric": "suite_wall_clock", "value": <spark total sec>,
     "unit": "sec", "sf": ..., "n_queries": ..., "duckdb_total_sec": ...,
     "ratio_vs_duckdb": ..., ...}

Per-query timings (Spark and DuckDB) go to the sidecar
``BENCH_DETAIL.json`` next to this script.

Each Spark query is fully executed JVM-side via the ``noop`` sink (no
Python collect — measures the engine, not Py4J/Arrow transfer). The
DuckDB oracle suite is timed the same way (fetchall on the same parquet).
``ratio_vs_duckdb`` compares equal workloads: the Spark total restricted
to sql-mode queries (those DuckDB also runs) over the DuckDB total;
``value`` remains the full-suite Spark wall-clock including rows-mode
queries DuckDB never executes.

Timing protocol (BASELINE.md steps 1-4): one shared warm SparkSession,
AQE on, one-time storage staging (bucketed tables, streaming source
files) in the untimed warm-up — mirroring the warehouse split between
ETL layout cost and query cost; suite-level total is the acceptance
figure; per-query secs are diagnostics.
"""

from __future__ import annotations

import json
import os
import sys
import time

_REPO = os.path.dirname(os.path.abspath(__file__))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = os.path.basename(sf_dir.rstrip("/")).removeprefix("sf")
    try:
        sf_num = float(sf)
    except ValueError:
        sf_num = sf

    from __spark_entry__ import oracle_sql, queries

    from dbt_local_duckdb_deltalake_project_spark.prestage import prestage
    from dbt_local_duckdb_deltalake_project_spark.session import get_spark

    spark = get_spark(app_name="bench")

    qs = queries()
    oracles = oracle_sql()

    # Warm-up (untimed): JVM JIT + parquet footer cache + one-time
    # storage staging (bucketed tables, streaming replay sources).
    prestage(spark, sf_dir)
    qs["agg_groupby_basic"](spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()

    per_query: dict[str, float] = {}
    errors: dict[str, str] = {}
    t_suite = time.perf_counter()
    for name in sorted(qs):
        t0 = time.perf_counter()
        try:
            qs[name](spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            per_query[name] = round(time.perf_counter() - t0, 4)
        except Exception as e:  # noqa: BLE001 — bench must always emit JSON
            errors[name] = f"{type(e).__name__}: {e}"[:200]
    spark_total = round(time.perf_counter() - t_suite, 3)

    # DuckDB baseline: same parquet, same queries, warm (BASELINE.md step 2).
    duck_total = None
    duck_per_query: dict[str, float] = {}
    try:
        import duckdb

        con = duckdb.connect()
        tables = (
            "region nation customer supplier part orders lineitem "
            "events documents embeddings"
        ).split()
        for tbl in tables:
            con.execute(
                f"CREATE VIEW {tbl} AS SELECT * FROM "
                f"read_parquet('{sf_dir}/{tbl}.parquet')"
            )
        con.execute(oracles["agg_groupby_basic"]).fetchall()  # warm-up
        t0 = time.perf_counter()
        for name in sorted(oracles):
            tq = time.perf_counter()
            try:
                con.execute(oracles[name]).fetchall()
                duck_per_query[name] = round(time.perf_counter() - tq, 4)
            except Exception:  # noqa: BLE001
                pass
        duck_total = round(time.perf_counter() - t0, 3)
    except Exception:  # noqa: BLE001
        pass

    # Equal-workload ratio: Spark time on the queries DuckDB actually ran.
    common = [n for n in per_query if n in duck_per_query]
    spark_sql_total = round(sum(per_query[n] for n in common), 3)

    detail = {
        "sf": sf_num,
        "queries": per_query,
        "duckdb_queries": duck_per_query,
        "errors": errors,
    }
    with open(os.path.join(_REPO, "BENCH_DETAIL.json"), "w") as f:
        json.dump(detail, f, indent=1, sort_keys=True)

    out = {
        "metric": "suite_wall_clock",
        "value": spark_total,
        "unit": "sec",
        "sf": sf_num,
        "n_queries": len(per_query),
        "n_errors": len(errors),
        "spark_sql_mode_sec": spark_sql_total,
        "duckdb_total_sec": duck_total,
        "n_common": len(common),
        "ratio_vs_duckdb": (
            round(spark_sql_total / duck_total, 3) if duck_total else None
        ),
        "detail": "BENCH_DETAIL.json",
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
