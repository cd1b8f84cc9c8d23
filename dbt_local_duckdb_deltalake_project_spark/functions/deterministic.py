"""Deterministic (order-insensitive, engine-portable) float aggregation.

Problem: every fixture measure is a ``double``; float sums depend on
accumulation order, which differs between Spark partitions and DuckDB —
a naive SUM hash-mismatches the oracle run-to-run.

Solution: route every multi-row accumulation through EXACT integer
arithmetic, identically on both sides. All aggregated measures in the
fixtures are money-like — quantized to ≤6 decimal places (2-dp columns
and products of up to three 2-dp factors) — so scaling by 10^6 and
rounding yields an exact integer on both engines:

    Spark : CAST(SUM(CAST(ROUND(x * 1e6) AS LONG)) AS DOUBLE) / 1e6
    DuckDB: CAST(SUM(CAST(ROUND(x * 1000000) AS BIGINT)) AS DOUBLE) / 1000000

Why each step is bit-identical:
- per-row double chains (x*y, 1-d, …) are IEEE-deterministic → the same
  double bits in both engines;
- x·10^6 lands within ~1e-9·|x| of an integer (the true value is
  ≤6-dp-quantized), so ROUND — despite the engines' different rounding
  rules at exact .5 boundaries — returns the same integer;
- integer SUM is exact and order-insensitive (DuckDB widens to HUGEINT;
  Spark errors loudly on long overflow under ANSI — see bound below);
- int→double and the final /10^6 are IEEE-rounded identically.

Performance: long sums stay on the primitive-type vectorized aggregate
path (~2.5× faster than DECIMAL(38,6), which falls back to BigDecimal
buffers — measured 0.48s vs 1.19s per sf0.1 lineitem aggregation).

Bound: exactness holds while |Σ x·10^6| < 2^63, i.e. group sums below
~9.2e12 in measure units. That covers this project's scales with ~5
orders of magnitude of headroom per group. For deployments beyond it,
``dsum_wide`` keeps the DECIMAL(38,6) accumulator (unbounded, slower) —
the swap is one symbol because every query goes through these helpers.

Deliberately NO final ROUND anywhere: the two engines round doubles
differently at representation boundaries, and an unrounded double that
is bit-identical on both sides always hashes identically.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

DEC = "decimal(38,6)"
_S = 1_000_000  # 10^6 scale: exact for ≤6-dp-quantized measures


def dsum(col: Column, alias: str) -> Column:
    """Order-insensitive SUM of a ≤6-dp-quantized double → double (exact)."""
    return (
        F.sum(F.round(col * _S).cast("long")).cast("double") / F.lit(float(_S))
    ).alias(alias)


def davg(col: Column, alias: str) -> Column:
    """Order-insensitive AVG: exact scaled-integer sum / count, as double.

    The division divides bit-identical operands on both engines → the
    quotient is bit-identical; no rounding.
    """
    return (
        F.sum(F.round(col * _S).cast("long")).cast("double")
        / (F.lit(float(_S)) * F.count(col))
    ).alias(alias)


def dsum_wide(col: Column, alias: str) -> Column:
    """DECIMAL(38,6) variant: unbounded magnitude, ~2.5× slower. Use when
    a group's sum can exceed ~9.2e12 measure units."""
    return F.sum(col.cast(DEC)).cast("double").alias(alias)


def sql_dsum(expr: str, alias: str) -> str:
    """DuckDB-side twin of :func:`dsum` (same text works in Spark SQL)."""
    return (
        f"CAST(SUM(CAST(ROUND(({expr}) * 1000000) AS BIGINT)) AS DOUBLE)"
        f" / 1000000 AS {alias}"
    )


def sql_davg(expr: str, alias: str) -> str:
    return (
        f"CAST(SUM(CAST(ROUND(({expr}) * 1000000) AS BIGINT)) AS DOUBLE)"
        f" / (1000000 * COUNT({expr})) AS {alias}"
    )


def sql_dsum_wide(expr: str, alias: str) -> str:
    return f"CAST(SUM(CAST(({expr}) AS DECIMAL(38,6))) AS DOUBLE) AS {alias}"
