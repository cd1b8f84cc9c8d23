#!/usr/bin/env python
"""Regenerate COVERAGE.md (query id → source location → oracle mode)."""

from __future__ import annotations

import inspect
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from dbt_local_duckdb_deltalake_project_spark.operators import ORACLE, QUERIES  # noqa: E402

lines = [
    "# COVERAGE — SURVEY.md §2 operator inventory → implementation\n",
    "Auto-generated map (regenerate with `python scripts/gen_coverage.py`). "
    "Every query id is runnable via `__spark_entry__.queries()[id](spark, "
    "sf_dir)`; `sql` mode = driver hash-matches the DuckDB oracle, `rows` = "
    "rows-only check (engine-specific hashes / approximate / streaming "
    "semantics — SURVEY.md §2 notes which).\n",
    "| query id | module | mode |",
    "|---|---|---|",
]
for qid in sorted(QUERIES):
    fn = QUERIES[qid]
    src = inspect.getsourcefile(fn).split(f"{REPO}/")[-1]
    line = inspect.getsourcelines(fn)[1]
    mode = "sql" if qid in ORACLE else "rows"
    lines.append(f"| `{qid}` | `{src}:{line}` | {mode} |")
lines.append(
    f"\n**Totals**: {len(QUERIES)} operators — {len(ORACLE)} sql-mode, "
    f"{len(QUERIES) - len(ORACLE)} rows-mode."
)
with open(os.path.join(REPO, "COVERAGE.md"), "w") as f:
    f.write("\n".join(lines) + "\n")
print(f"COVERAGE.md: {len(QUERIES)} operators")
