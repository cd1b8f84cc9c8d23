"""The public Engine facade: all three entry points over one catalog."""

from __future__ import annotations

from pyspark.sql import functions as F

from dbt_local_duckdb_deltalake_project_spark.engine import connect


def test_sql_and_dataframe_share_catalog(spark, sf_dir):
    eng = connect(sf_dir, spark)
    n_sql = eng.sql("SELECT COUNT(*) AS n FROM orders").collect()[0].n
    n_df = eng.table("orders").count()
    assert n_sql == n_df > 0


def test_registered_query_runs(spark, sf_dir):
    eng = connect(sf_dir, spark)
    assert "agg_groupby_basic" in eng.queries()
    assert eng.query("agg_groupby_basic").count() > 0


def test_model_graph_entry_point(spark, sf_dir):
    eng = connect(sf_dir, spark)
    g = eng.model_graph("facade_demo")

    def daily(spark, deps):
        return (
            deps["orders"]
            .groupBy(F.date_trunc("day", "o_orderdate").alias("day"))
            .agg(F.count(F.lit(1)).alias("n"))
        )

    g.model("daily_orders", deps=["orders"], materialized="view")(daily)
    out = g.run(spark, {"orders": eng.table("orders")})
    assert out["daily_orders"].count() > 0
    # view materialization is visible through the SQL entry point too
    assert eng.sql("SELECT COUNT(*) AS n FROM daily_orders").collect()[0].n > 0
