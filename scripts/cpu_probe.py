#!/usr/bin/env python
"""Noise-resistant per-query cost probe: JVM CPU-seconds per execution.

Wall-clock on this host swings 2-3x with neighbor load; the JVM's
utime+stime delta for one query execution is (mostly) load-independent,
so A/B comparisons of plan changes stay meaningful. Reports, per named
query over N repeats: min wall seconds and min CPU seconds.

Usage: python scripts/cpu_probe.py [-n REPEATS] q1 q2 ...
"""

from __future__ import annotations

import argparse
import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)


def _jvm_pid() -> int:
    me = os.getpid()
    for pid in os.listdir("/proc"):
        if not pid.isdigit():
            continue
        try:
            with open(f"/proc/{pid}/stat") as f:
                parts = f.read().split()
            if int(parts[3]) == me and "java" in parts[1]:
                return int(pid)
        except OSError:
            continue
    raise RuntimeError("no java child found")


def _cpu_sec(pid: int) -> float:
    with open(f"/proc/{pid}/stat") as f:
        parts = f.read().split()
    tick = os.sysconf("SC_CLK_TCK")
    return (int(parts[13]) + int(parts[14])) / tick


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("-n", type=int, default=4)
    args = ap.parse_args()
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from __spark_entry__ import queries

    from dbt_local_duckdb_deltalake_project_spark.prestage import prestage
    from dbt_local_duckdb_deltalake_project_spark.session import get_spark

    qs = queries()
    spark = get_spark(app_name="cpu_probe")
    prestage(spark, sf_dir)
    qs["agg_groupby_basic"](spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()
    jpid = _jvm_pid()
    # my own python process cost counts too (plan construction)
    import resource

    for name in args.names:
        walls, cpus = [], []
        s = (
            spark.newSession()
            if name.startswith("stream_") or name.endswith("_streamed")
            else spark
        )
        for _ in range(args.n):
            c0 = _cpu_sec(jpid)
            p0 = resource.getrusage(resource.RUSAGE_SELF)
            t0 = time.perf_counter()
            qs[name](s, sf_dir).write.format("noop").mode("overwrite").save()
            walls.append(time.perf_counter() - t0)
            p1 = resource.getrusage(resource.RUSAGE_SELF)
            cpus.append(
                _cpu_sec(jpid)
                - c0
                + (p1.ru_utime - p0.ru_utime)
                + (p1.ru_stime - p0.ru_stime)
            )
        print(
            f"{min(walls):8.2f}w {min(cpus):8.2f}c  {name}   "
            f"(walls {[round(w,1) for w in walls]},"
            f" cpus {[round(c,1) for c in cpus]})",
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
