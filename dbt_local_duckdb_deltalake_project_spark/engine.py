"""Public user surface: ``connect()`` → ``Engine``.

The reference stack exposes three entry points (SURVEY.md §3): dbt model
runs, raw SQL (``duckdb.connect().sql(...)``), and the lazy relational
API. ``Engine`` is the Spark-native analogue of all three behind one
handle — what a user of the reference would pick up to switch:

    from dbt_local_duckdb_deltalake_project_spark.engine import connect

    eng = connect("/root/testdata/sf0.01")     # entry B/C: SQL + DataFrames
    eng.sql("SELECT count(*) FROM lineitem")   # → DataFrame (lazy)
    eng.table("orders").groupBy(...)           # → DataFrame (lazy)

    g = eng.model_graph("marts")               # entry A: dbt-style DAG
    g.model("gold", deps=["orders"], materialized="table")(fn)
    g.run(eng.spark, {"orders": eng.table("orders")})

    eng.query("agg_groupby_basic")             # any registered operator

SQL and DataFrame calls converge on one Catalyst catalog (the fixture
views), exactly as DuckDB's SQL and relational APIs share one binder.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from .catalog import DEFAULT_SF_DIR, register_views, t
from .plans.graph import ModelGraph
from .session import get_spark
from .sources.workspace import workdir


class Engine:
    def __init__(self, sf_dir: str, spark: SparkSession | None = None):
        self.sf_dir = sf_dir
        self.spark = spark or get_spark()
        register_views(self.spark, sf_dir)

    # -- entry B: SQL ----------------------------------------------------
    def sql(self, query: str) -> DataFrame:
        """Run SQL against the registered tables (lazy)."""
        register_views(self.spark, self.sf_dir)
        return self.spark.sql(query)

    # -- entry C: relational API ----------------------------------------
    def table(self, name: str) -> DataFrame:
        """A fixture table as a lazy DataFrame."""
        return t(self.spark, self.sf_dir, name)

    # -- entry A: model DAG ---------------------------------------------
    def model_graph(self, name: str) -> ModelGraph:
        """A dbt-style model graph whose materializations land under the
        engine workspace for this fixture set."""
        return ModelGraph(workdir(self.sf_dir, f"graph_{name}", fresh=False))

    # -- registered operator surface ------------------------------------
    def query(self, qid: str) -> DataFrame:
        """Run a registered SURVEY.md §2 operator by id."""
        from .operators import QUERIES

        return QUERIES[qid](self.spark, self.sf_dir)

    def queries(self) -> list[str]:
        from .operators import QUERIES

        return sorted(QUERIES)


def connect(
    sf_dir: str | None = None, spark: SparkSession | None = None
) -> Engine:
    """duckdb.connect()-shaped constructor for the Spark engine."""
    return Engine(sf_dir or os.environ.get("SPARK_GRAFT_SF_DIR", DEFAULT_SF_DIR), spark)
