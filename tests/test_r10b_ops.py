"""r10-continuation operator checks: third-implementation differentials.

test_oracle.py already diffs each new op against its DuckDB oracle; the
oracle mirrors the engine's algebra, so a shared algebraic mistake would
pass. These tests add an INDEPENDENT implementation per op — numpy
lstsq for the exact-rational OLS, a pure-Python integer replication of
the LMS training loop, a hand-computed funnel on a crafted corpus for
the dedup cascade — plus plan/value assertions for the session-variable
and HLL-intersection ops.
"""

from __future__ import annotations

import os

import duckdb
import numpy as np
import pytest

from dbt_local_duckdb_deltalake_project_spark.catalog import TABLES, table_path
from dbt_local_duckdb_deltalake_project_spark.operators import ORACLE, QUERIES


def test_ols_matches_numpy_lstsq(spark, sf_dir):
    row = QUERIES["agg_ols_normal_equations"](spark, sf_dir).collect()[0]
    con = duckdb.connect()
    df = con.execute(
        "SELECT ROUND(l_extendedprice * 100) AS y, l_quantity AS x1, "
        "ROUND(l_discount * 100) AS x2 FROM "
        f"read_parquet('{table_path(sf_dir, 'lineitem')}')"
    ).fetchdf()
    con.close()
    A = np.column_stack([np.ones(len(df)), df.x1, df.x2])
    beta, *_ = np.linalg.lstsq(A, df.y.values, rcond=None)
    got = np.array(
        [row.b0_micros, row.b1_micros, row.b2_micros], dtype=float
    ) / 1e6
    # floor-to-micros adds < 1e-6 absolute; lstsq carries ~1e-10 relative
    assert np.allclose(got, beta, rtol=1e-8, atol=2e-6), (got, beta)
    assert row.yhat_q25_d5_micros == (
        row.b0_micros + 25 * row.b1_micros + 5 * row.b2_micros
    )


def _py_floor_div(a: int, b: int) -> int:
    return a // b  # Python // IS floor division


def test_lms_matches_pure_python_replication(spark, sf_dir):
    rows = QUERIES["llm_classifier_train_lms"](spark, sf_dir).collect()
    con = duckdb.connect()
    docs = con.execute(
        "SELECT text, lang FROM "
        f"read_parquet('{table_path(sf_dir, 'documents')}')"
    ).fetchall()
    con.close()
    feats = []
    for text, lang in docs:
        toks = text.split(" ")
        nt, nd = len(toks), len(set(toks))
        sc = sum(len(w) for w in toks)
        feats.append(
            (
                1000 if lang == "en" else 0,
                1000,
                (1000 * (nt - nd)) // nt,
                (100 * sc) // nt,
            )
        )
    w = [0, 0, 0]
    expected = []
    for step in range(4):
        g = [0, 0, 0]
        sse = 0
        n = len(feats)
        for y, f0, f1, f2 in feats:
            pred = _py_floor_div(w[0] * f0 + w[1] * f1 + w[2] * f2, 10**6)
            r = pred - y
            g[0] += r * f0
            g[1] += r * f1
            g[2] += r * f2
            sse += r * r
        expected.append((step, w[0], w[1], w[2], sse))
        w = [w[j] - _py_floor_div(g[j], 2 * n) for j in range(3)]
    got = [
        (r.step, r.w0_micros, r.w1_micros, r.w2_micros, r.sse_milli2)
        for r in rows
    ]
    assert got == expected
    sses = [r[4] for r in got]
    assert sses == sorted(sses, reverse=True), "loss must be non-increasing"


# -- dedup cascade on a crafted corpus with a hand-computed funnel ----------

_CASCADE_DOCS = [
    (0, "a b c d e"),    # survives all three stages
    (1, "a b c d e"),    # exact duplicate of 0 → removed at stage 1
    (2, "a b c d"),      # proper prefix of "a b c d e" → removed at stage 2
    (3, "z a b c d e"),  # 3-gram Jaccard 3/4 with doc 0 → removed at stage 3
    (4, "q r s t u"),    # unrelated → survives
]

_CASCADE_EXPECTED = [
    ("1_exact", 5, 1, 4),
    ("2_prefix", 4, 1, 3),
    ("3_neardup", 3, 1, 2),
]


@pytest.fixture(scope="module")
def cascade_dir(tmp_path_factory, sf_dir, spark):
    d = tmp_path_factory.mktemp("crafted_cascade")
    for name in TABLES:
        if name != "documents":
            os.symlink(f"{sf_dir}/{name}.parquet", d / f"{name}.parquet")
    rows = [
        (doc_id, text, "en", "crafted", len(text))
        for doc_id, text in _CASCADE_DOCS
    ]
    spark.createDataFrame(
        rows,
        "doc_id long, text string, lang string, source string, n_chars long",
    ).coalesce(1).write.parquet(str(d / "documents.parquet"))
    return str(d)


def test_dedup_cascade_hand_computed_funnel(spark, cascade_dir):
    got = [
        (r.stage, r.docs_in, r.removed, r.survivors)
        for r in QUERIES["pipeline_dedup_cascade"](spark, cascade_dir)
        .collect()
    ]
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{cascade_dir}/documents.parquet/*.parquet')"
    )
    oracle = [
        tuple(r) for r in con.execute(ORACLE["pipeline_dedup_cascade"]).fetchall()
    ]
    con.close()
    assert got == oracle, "engine vs oracle diverge on crafted cascade"
    assert got == _CASCADE_EXPECTED, "both engines agree on a WRONG funnel"


def test_dedup_cascade_stage_flow_consistency(spark, sf_dir):
    rows = QUERIES["pipeline_dedup_cascade"](spark, sf_dir).collect()
    assert [r.stage for r in rows] == ["1_exact", "2_prefix", "3_neardup"]
    for r in rows:
        assert r.removed >= 0
        assert r.docs_in - r.removed == r.survivors
    assert rows[0].survivors == rows[1].docs_in
    assert rows[1].survivors == rows[2].docs_in


def test_hll_intersection_exact_values_and_bounds(spark, sf_dir, duck):
    row = QUERIES["agg_hll_intersection"](spark, sf_dir).collect()[0]
    exact = duck.execute(
        """
        SELECT COUNT(*) FROM (
          SELECT DISTINCT o_custkey FROM orders
          WHERE o_orderpriority = '1-URGENT'
          INTERSECT
          SELECT DISTINCT o_custkey FROM orders
          WHERE o_orderpriority = '2-HIGH'
        )
        """
    ).fetchone()[0]
    assert row.exact_intersection == exact
    assert row.sets_within_3pct and row.intersection_within_5pct


def test_session_variables_fold_and_push_down(spark, sf_dir):
    df = QUERIES["sql_session_variables"](spark, sf_dir)
    p = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    pushed = [ln for ln in p.splitlines() if "PushedFilters" in ln]
    # variable references must have folded to literals and reached the scan
    assert pushed and "l_shipdate" in pushed[0] and "l_quantity" in pushed[0]
