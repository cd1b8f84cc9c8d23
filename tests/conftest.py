from __future__ import annotations

import os
import sys

import duckdb
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

from dbt_local_duckdb_deltalake_project_spark.catalog import TABLES, table_path
from dbt_local_duckdb_deltalake_project_spark.session import get_spark

# Differential tests default to the smallest fixture for speed; set
# TEST_SF_DIR=/root/testdata/sf0.01 to run at the driver's correctness SF.
SF_DIR = os.environ.get("TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_DIR


@pytest.fixture(scope="session")
def spark():
    s = get_spark(cpus=os.environ.get("SPARK_GRAFT_CPUS", "8"), shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def duck():
    con = duckdb.connect()
    for name in TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {name} AS "
            f"SELECT * FROM read_parquet('{table_path(SF_DIR, name)}')"
        )
    yield con
    con.close()
