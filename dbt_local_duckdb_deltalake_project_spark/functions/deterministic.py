"""Deterministic floating-point aggregation helpers.

Problem (SURVEY.md §7.4): every fixture measure is a ``double``; float
addition is non-associative, so a parallel sum's result depends on
partition order — it differs run-to-run in Spark AND between Spark and the
DuckDB oracle. A correctness gate that hash-matches values cannot tolerate
that.

Solution: route every multi-row accumulation through exact decimal
arithmetic, identically on both sides:

    Spark : CAST(SUM(CAST(x AS DECIMAL(38,6))) AS DOUBLE)
    DuckDB: CAST(SUM(CAST(x AS DECIMAL(38,6))) AS DOUBLE)

Per-row double expressions (x*y, 1-d, …) are IEEE-deterministic and produce
bit-identical doubles in both engines; the double→decimal cast rounds at
6 dp identically; the decimal sum is exact (order-insensitive);
decimal→double is IEEE-nearest in both.

Deliberately NO final ROUND: the two engines round doubles differently at
representation boundaries (Spark rounds the shortest decimal repr HALF_UP;
DuckDB rounds the scaled binary value), and the fixture measures are
2-dp-quantized money, which lands on those boundaries constantly. An
unrounded double that is bit-identical on both sides hashes identically;
a rounded one can flip. Rounding is reserved for values that genuinely
differ across engines (transcendentals, quantile interpolation) where a
coarse grid beats a 1-ulp mismatch.

Scale note: decimal sums remain whole-stage-codegen'd JVM aggregates with
map-side partial aggregation — the shuffle profile is identical to a
double sum, so this costs ~nothing at 100 TB and buys bitwise
reproducibility.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

DEC = "decimal(38,6)"


def dsum(col: Column, alias: str) -> Column:
    """Order-insensitive SUM of a double expression → double (exact)."""
    return F.sum(col.cast(DEC)).cast("double").alias(alias)


def davg(col: Column, alias: str) -> Column:
    """Order-insensitive AVG: exact decimal sum / count, as double.

    The division divides bit-identical operands on both engines → the
    quotient is bit-identical; no rounding.
    """
    return (F.sum(col.cast(DEC)).cast("double") / F.count(col)).alias(alias)


def sql_dsum(expr: str, alias: str) -> str:
    """DuckDB-side twin of :func:`dsum` (same text works in Spark SQL)."""
    return (
        f"CAST(SUM(CAST(({expr}) AS DECIMAL(38,6))) AS DOUBLE) AS {alias}"
    )


def sql_davg(expr: str, alias: str) -> str:
    return (
        f"CAST(SUM(CAST(({expr}) AS DECIMAL(38,6))) AS DOUBLE)"
        f" / COUNT({expr}) AS {alias}"
    )
