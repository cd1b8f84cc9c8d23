"""Order-insensitive differential comparison between a Spark result and a
DuckDB oracle result — a strict local stand-in for the driver's
row-count + schema + value-hash check (driver contract,
/root/repo/__spark_entry__.py docstring).

Everything is canonicalized to strings: columns sorted by name, each cell
rendered deterministically (floats via repr of float64 — queries are
responsible for making float values bit-stable, see
functions/deterministic.py), rows sorted lexicographically.
"""

from __future__ import annotations

import datetime
import decimal
import math

import numpy as np
import pandas as pd


def _cell(v) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, (np.floating, float)):
        f = float(v)
        if math.isnan(f):
            return "NULL"
        return repr(f)
    if isinstance(v, (np.integer, int)) and not isinstance(v, bool):
        return str(int(v))
    if isinstance(v, (np.bool_, bool)):
        return str(bool(v))
    if isinstance(v, pd.Timestamp):
        if v is pd.NaT:
            return "NULL"
        return v.isoformat()
    if isinstance(v, datetime.datetime):
        return pd.Timestamp(v).isoformat()
    if isinstance(v, datetime.date):
        return v.isoformat()
    if isinstance(v, decimal.Decimal):
        return repr(float(v))
    if isinstance(v, (list, tuple, np.ndarray)):
        return "[" + ",".join(_cell(x) for x in v) + "]"
    if isinstance(v, dict):
        return "{" + ",".join(f"{k}:{_cell(x)}" for k, x in sorted(v.items())) + "}"
    if isinstance(v, (bytes, bytearray)):
        return "0x" + bytes(v).hex()
    if v is pd.NaT or (isinstance(v, float) and math.isnan(v)):
        return "NULL"
    return str(v)


def canonical(pdf: pd.DataFrame) -> tuple[list[str], list[tuple[str, ...]]]:
    cols = sorted(pdf.columns)
    pdf = pdf[cols]
    rows = []
    for row in pdf.itertuples(index=False, name=None):
        rows.append(tuple(_cell(v) for v in row))
    rows.sort()
    return cols, rows


def assert_same(spark_pdf: pd.DataFrame, duck_pdf: pd.DataFrame, qid: str) -> None:
    scols, srows = canonical(spark_pdf)
    dcols, drows = canonical(duck_pdf)
    assert scols == dcols, f"{qid}: column mismatch spark={scols} duck={dcols}"
    assert len(srows) == len(drows), (
        f"{qid}: row count mismatch spark={len(srows)} duck={len(drows)}"
    )
    for i, (s, d) in enumerate(zip(srows, drows)):
        assert s == d, (
            f"{qid}: value mismatch at sorted row {i}\n"
            f"  cols : {scols}\n  spark: {s}\n  duck : {d}"
        )
