"""Central registry of (query id → PySpark callable, DuckDB oracle SQL).

Every operator from SURVEY.md §2 registers here; ``__spark_entry__.py``
exports the two dicts verbatim. Queries without an oracle entry are
rows-mode (non-SQL-expressible or nondeterministic — SURVEY.md §2 notes
which).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLE: dict[str, str] = {}


def register(qid: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Decorator: register a query callable and (optionally) its oracle SQL.

    Column-name discipline: the Spark DataFrame and the oracle SQL MUST
    alias every computed column to the same name — the driver sorts columns
    by name before hashing (driver contract, /root/repo/__spark_entry__.py).
    """

    def deco(fn: QueryFn) -> QueryFn:
        if qid in QUERIES:
            raise ValueError(f"duplicate query id: {qid}")
        QUERIES[qid] = fn
        if oracle is not None:
            ORACLE[qid] = oracle
        return fn

    return deco
