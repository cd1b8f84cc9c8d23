#!/usr/bin/env python
"""Serial isolated profiler for declared queries (optimization guide §1).

Runs each named query (or the N most expensive per BENCH_DETAIL.json)
SERIALLY in one warm session against $SPARK_GRAFT_SF_DIR through the
noop sink, prints per-query wall seconds, and (with --plans DIR) writes
`<query>_<tag>.txt` files containing explain("formatted") output.

Usage:
    python scripts/profile_queries.py q1 q2 ...           # time these
    python scripts/profile_queries.py --top 30            # top-30 by sidecar
    python scripts/profile_queries.py --plans plans/r13 --tag before q1 q2
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="*")
    ap.add_argument("--top", type=int, default=0)
    ap.add_argument("--plans", default="")
    ap.add_argument("--tag", default="before")
    ap.add_argument("--repeat", type=int, default=1)
    args = ap.parse_args()

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from __spark_entry__ import queries

    from dbt_local_duckdb_deltalake_project_spark.prestage import prestage
    from dbt_local_duckdb_deltalake_project_spark.session import get_spark

    qs = queries()
    names = list(args.names)
    if args.top:
        with open(os.path.join(_REPO, "BENCH_DETAIL.json")) as f:
            cost = json.load(f)["queries"]
        names += [
            n
            for n, _ in sorted(cost.items(), key=lambda kv: -kv[1])
            if n in qs
        ][: args.top]

    spark = get_spark(app_name="profile")
    prestage(spark, sf_dir)
    # JVM warm-up, untimed
    qs["agg_groupby_basic"](spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()

    own_session_markers = ("_streamed", "stream_")
    results: dict[str, float] = {}
    for name in names:
        s = (
            spark.newSession()
            if name.startswith(own_session_markers[1])
            or name.endswith(own_session_markers[0])
            else spark
        )
        best = None
        for _ in range(max(1, args.repeat)):
            spark.sparkContext.setJobDescription(f"profile:{name}")
            t0 = time.perf_counter()
            df = qs[name](s, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        results[name] = round(best, 3)
        print(f"{best:8.3f}  {name}", flush=True)
        if args.plans:
            os.makedirs(os.path.join(_REPO, args.plans), exist_ok=True)
            try:
                txt = df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
                    df._jdf.queryExecution(), "formatted"
                )
            except Exception:  # noqa: BLE001
                txt = df._jdf.queryExecution().explainString(  # noqa: SLF001
                    getattr(
                        df._sc._jvm.org.apache.spark.sql.execution,  # noqa: SLF001
                        "ExplainMode",
                    ).fromString("formatted")
                )
            with open(
                os.path.join(_REPO, args.plans, f"{name}_{args.tag}.txt"), "w"
            ) as f:
                f.write(txt)
    print(json.dumps({"total": round(sum(results.values()), 3), "n": len(results)}))
    spark.stop()


if __name__ == "__main__":
    main()
