"""Fixture-table catalog: parquet files → DataFrames + temp views.

Every query entry point funnels through here so the SQL (entry B) and
DataFrame (entry C) surfaces share one catalog (SURVEY.md §3.2–3.3).

Scale note: at 100 TB each of these would be a partitioned/bucketed table
(lineitem bucketed by l_orderkey, orders by o_orderkey) registered in a
real metastore; locally they are single parquet files. The query code only
sees view names, so the swap is transparent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

TABLES: tuple[str, ...] = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = "/root/testdata/sf0.001"

# last sf_dir whose views were registered, per live SparkSession —
# re-register only when the target directory changes. Keyed on the Spark
# applicationId (stable for a session's lifetime, never reused the way a
# garbage-collected id() can be), so a stopped-then-recreated session
# never receives DataFrame handles bound to the dead session.
_registered: dict[str, str] = {}

# DataFrame handles are immutable and lazily evaluated — cache them per
# (session, sf_dir, table) so repeated t() calls skip re-reading parquet
# footers for schema (a measurable slice of the per-query floor).
_df_cache: dict[tuple[str, str, str], DataFrame] = {}


def _session_key(spark: SparkSession) -> str:
    return spark.sparkContext.applicationId


def table_path(sf_dir: str, name: str) -> str:
    return f"{sf_dir}/{name}.parquet"


def read_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Lazy parquet scan of one fixture table.

    ``events.ts`` is written as parquet TIMESTAMP(NANOS), which Spark's
    vectorized reader rejects; we read nanos as long
    (spark.sql.legacy.parquet.nanosAsLong) and truncate to microsecond
    timestamps — the same ns→µs truncation DuckDB applies, so the oracle
    sees identical values (SURVEY.md §1.1).
    """
    # Pin session confs BEFORE the cache lookup: the cache key is the
    # applicationId, which every spark.newSession() clone shares, so a
    # clone can cache-hit and otherwise never get the pins (bench's
    # own-session streamed ops would then bucket windows on the host tz).
    # conf.set is a cheap local map write — no Spark job.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    # Entry paths may hand us a vanilla session (the driver does); pin the
    # tz here so NTZ→TIMESTAMP casts and window bucketing match the naive
    # DuckDB oracle regardless of host tz.
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    key = (_session_key(spark), sf_dir, name)
    cached = _df_cache.get(key)
    if cached is not None:
        return cached
    df = spark.read.parquet(table_path(sf_dir, name))
    for field in df.schema.fields:
        if name == "events" and field.name == "ts":
            if isinstance(field.dataType, T.LongType):
                df = df.withColumn(
                    "ts", F.timestamp_micros(F.expr("ts div 1000"))
                )
            elif isinstance(field.dataType, T.TimestampNTZType):
                # A vanilla session (no nanosAsLong at first footer read)
                # infers TIMESTAMP_NTZ (Spark 4 inferTimestampNTZ), which
                # unix_micros() and withWatermark() both reject. The
                # session tz is UTC in every entry path, so the cast is
                # value-preserving.
                df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    _df_cache[key] = df
    return df


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register all fixture tables as temp views named after themselves.

    Idempotent per (session, sf_dir); re-points the views when sf_dir
    changes (e.g. correctness at sf0.01 then bench at sf0.1).
    """
    key = _session_key(spark)
    if _registered.get(key) == sf_dir:
        return
    for t in TABLES:
        read_table(spark, sf_dir, t).createOrReplaceTempView(t)
    _registered[key] = sf_dir


def t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one table AND ensure the whole catalog's views are registered,
    so mixed DataFrame/SQL queries always resolve."""
    register_views(spark, sf_dir)
    return read_table(spark, sf_dir, name)


def sql(spark: SparkSession, sf_dir: str, query: str) -> DataFrame:
    """Run SQL against the registered fixture views."""
    register_views(spark, sf_dir)
    return spark.sql(query)
