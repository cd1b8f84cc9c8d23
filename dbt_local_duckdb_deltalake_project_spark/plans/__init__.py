"""Medallion pipeline layer: the dbt-runtime semantics of the reference
(model DAG, materializations, schema tests) re-expressed as a Spark-native
model graph (SURVEY.md §2.12, §3.1).
"""

from .graph import Model, ModelGraph  # noqa: F401
