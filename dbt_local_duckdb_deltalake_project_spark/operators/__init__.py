"""Operator inventory (SURVEY.md §2). Importing this package populates the
registry; add new operator modules to _MODULES as they land."""

from __future__ import annotations

from importlib import import_module

from .registry import ORACLE, QUERIES, register  # noqa: F401

_MODULES = [
    "aggregates",
    "rowops",
    "joins",
    "setops",
    "windows",
    "subqueries",
    "functions_lib",
    "eventtime",
    "llm_ops",
    "udfs",
    "scans",
    "delta_ops",
    "dbt_ops",
    "streaming_ops",
    "multimodal",
    "medallion",
]

for _m in _MODULES:
    import_module(f"{__name__}.{_m}")
