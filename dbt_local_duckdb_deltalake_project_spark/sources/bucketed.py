"""One-time bucketed-table staging (the 100 TB co-located-join layout).

On a warehouse, bucketing the big fact tables by their join key is a
one-time ETL cost that removes the dominant shuffle from every subsequent
join on that key. This module makes that "one-time" property real
locally: the bucketed files are written once per fixture dir and reused —
across queries, benches, AND processes (a new SparkSession re-attaches
the existing files with a metadata-only ``CREATE TABLE ... CLUSTERED BY``
DDL instead of rewriting data).
"""

from __future__ import annotations

import os
import re

from pyspark.sql import SparkSession

from ..catalog import t
from .workspace import (
    fixture_fingerprint,
    mark_staged,
    staging_current,
    staging_lock,
    workdir,
)

BUCKETS = 8

_SPECS = (
    # (table suffix, source table, bucket/sort key, projected columns)
    ("orders", "orders", "o_orderkey", ("o_orderkey", "o_totalprice")),
    ("lineitem", "lineitem", "l_orderkey", ("l_orderkey", "l_extendedprice")),
)


def _sf_tag(sf_dir: str) -> str:
    base = os.path.basename(sf_dir.rstrip("/")) or "default"
    return re.sub(r"[^0-9a-zA-Z]", "_", base)


def ensure_bucketed_tables(spark: SparkSession, sf_dir: str) -> tuple[str, str]:
    """Return (orders_table, lineitem_table), staging them if needed.

    Three tiers, cheapest first: catalog hit (no-op) → files already on
    disk (metadata-only external-table DDL) → full bucketed write.
    """
    tag = _sf_tag(sf_dir)
    names = []
    with staging_lock:  # parallel bench threads: no drop-under-reader race
        for suffix, source, key, cols in _SPECS:
            name = f"bkt_{suffix}_{tag}"
            names.append(name)
            path = workdir(sf_dir, f"bucketed_{suffix}", fresh=False)
            current = staging_current(path, sf_dir)
            if spark.catalog.tableExists(name):
                if current:
                    continue
                spark.sql(f"DROP TABLE {name}")  # fixtures regenerated underneath
            fp = fixture_fingerprint(sf_dir)  # BEFORE reading the source
            src = t(spark, sf_dir, source).select(*cols)
            if current and os.path.exists(os.path.join(path, "_SUCCESS")):
                col_defs = ", ".join(
                    f"{f.name} {f.dataType.simpleString()}"
                    for f in src.schema.fields
                )
                spark.sql(
                    f"CREATE TABLE {name} ({col_defs}) USING PARQUET "
                    f"CLUSTERED BY ({key}) SORTED BY ({key}) "
                    f"INTO {BUCKETS} BUCKETS LOCATION '{path}'"
                )
            else:
                src.write.bucketBy(BUCKETS, key).sortBy(key).option(
                    "path", path
                ).mode("overwrite").saveAsTable(name)
                mark_staged(path, sf_dir, fp)
    return names[0], names[1]
