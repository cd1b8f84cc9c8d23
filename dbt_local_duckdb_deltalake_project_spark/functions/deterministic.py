"""Deterministic floating-point aggregation helpers.

Problem (SURVEY.md §7.4): every fixture measure is a ``double``; float
addition is non-associative, so a parallel sum's result depends on
partition order — it differs run-to-run in Spark AND between Spark and the
DuckDB oracle. A correctness gate that hash-matches values cannot tolerate
that.

Solution: route every multi-row accumulation through exact decimal
arithmetic, identically on both sides:

    Spark : ROUND(CAST(SUM(CAST(x AS DECIMAL(38,6))) AS DOUBLE), nd)
    DuckDB: ROUND(CAST(SUM(CAST(x AS DECIMAL(38,6))) AS DOUBLE), nd)

Per-row double expressions (x*y, 1-d, …) are IEEE-deterministic and produce
bit-identical doubles in both engines; the double→decimal cast rounds
half-up at 6 dp identically; the decimal sum is exact (order-insensitive);
decimal→double is IEEE-nearest in both. The final ROUND (half-away-from-
zero in both engines, verified in SURVEY.md §7.4) is belt-and-braces.

Scale note: decimal sums are marginally slower than double sums but remain
whole-stage-codegen'd JVM aggregates with map-side partial aggregation —
the shuffle profile is identical, so this costs ~nothing at 100 TB and
buys bitwise reproducibility.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

DEC = "decimal(38,6)"


def dsum(col: Column, alias: str, nd: int = 2) -> Column:
    """Order-insensitive SUM of a double expression → double, rounded."""
    return F.round(F.sum(col.cast(DEC)).cast("double"), nd).alias(alias)


def davg(col: Column, alias: str, nd: int = 6) -> Column:
    """Order-insensitive AVG: exact decimal sum / count, as double."""
    return F.round(
        F.sum(col.cast(DEC)).cast("double") / F.count(col), nd
    ).alias(alias)


def sql_dsum(expr: str, alias: str, nd: int = 2) -> str:
    """DuckDB-side twin of :func:`dsum` (same text works in Spark SQL)."""
    return (
        f"ROUND(CAST(SUM(CAST(({expr}) AS DECIMAL(38,6))) AS DOUBLE), {nd})"
        f" AS {alias}"
    )


def sql_davg(expr: str, alias: str, nd: int = 6) -> str:
    return (
        f"ROUND(CAST(SUM(CAST(({expr}) AS DECIMAL(38,6))) AS DOUBLE)"
        f" / COUNT({expr}), {nd}) AS {alias}"
    )
