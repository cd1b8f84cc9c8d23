"""Differential oracle tests: every registered query vs its DuckDB oracle
(SURVEY.md §5 strategy 1). Rows-mode queries (no oracle) just execute and
must return a well-formed result."""

from __future__ import annotations

import pytest

from dbt_local_duckdb_deltalake_project_spark.operators import ORACLE, QUERIES

from ._compare import assert_same


@pytest.mark.parametrize("qid", sorted(QUERIES))
def test_query_matches_oracle(qid, spark, duck, sf_dir):
    sdf = QUERIES[qid](spark, sf_dir)
    spark_pdf = sdf.toPandas()
    if qid not in ORACLE:
        # rows-mode: must execute and yield a stable schema
        assert spark_pdf.shape[1] > 0
        return
    # sql-mode outputs must be scalar-only: the round driver hashes row
    # tuples and an array/map/struct column raises `unhashable type`
    # (round 1's agg_collect FAIL). Serialize arrays at the query edge.
    nested = [
        f.name
        for f in sdf.schema.fields
        if type(f.dataType).__name__ in ("ArrayType", "MapType", "StructType")
    ]
    assert not nested, f"{qid}: non-scalar sql-mode output columns {nested}"
    # NULL temporal outputs are banned in sql-mode (CLAUDE.md r6/r8):
    # duckdb fetchdf renders them as pandas NaT and no driver-green op
    # has ever exercised that hasher path — emit unix_micros/epoch_us
    # longs instead (the stream outer-join pattern). The r8 audit found
    # zero at sf0.001 AND sf0.1; this pin keeps it that way for free
    # (the result is already collected above).
    nat_cols = [
        f.name
        for f in sdf.schema.fields
        if type(f.dataType).__name__
        in ("TimestampType", "TimestampNTZType", "DateType")
        and spark_pdf[f.name].isna().any()
    ]
    assert not nat_cols, f"{qid}: NULL temporal output columns {nat_cols}"
    # Type widths must match exactly (spark int vs duck BIGINT can fail a
    # strict driver schema hash even when values agree — pandas hides the
    # width once NULLs coerce to float64, so compare declared types).
    rel = duck.sql(ORACLE[qid])
    duck_types = dict(zip(rel.columns, (str(dt) for dt in rel.types)))
    spark_types = {f.name: f.dataType.simpleString() for f in sdf.schema.fields}
    _ALLOWED = {
        ("bigint", "BIGINT"), ("int", "INTEGER"), ("smallint", "SMALLINT"),
        ("double", "DOUBLE"), ("float", "FLOAT"), ("string", "VARCHAR"),
        ("boolean", "BOOLEAN"), ("date", "DATE"), ("binary", "BLOB"),
        # date_trunc pattern (CLAUDE.md): spark stays timestamp, oracle
        # casts to TIMESTAMP; the driver hasher accepts either direction.
        ("timestamp", "TIMESTAMP"), ("timestamp", "DATE"),
        ("timestamp_ntz", "TIMESTAMP"),
    }
    mismatched = {
        c: (spark_types.get(c), dt)
        for c, dt in duck_types.items()
        if (spark_types.get(c), dt) not in _ALLOWED
        and not (
            (spark_types.get(c) or "").upper().startswith("DECIMAL")
            and dt.startswith("DECIMAL")
        )
    }
    assert not mismatched, f"{qid}: spark/duck type-width mismatches {mismatched}"
    duck_pdf = duck.execute(ORACLE[qid]).fetchdf()
    assert_same(spark_pdf, duck_pdf, qid)
