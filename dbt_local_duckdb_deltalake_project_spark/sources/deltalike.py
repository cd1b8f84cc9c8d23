"""Delta-protocol-shaped versioned parquet table (SURVEY.md §2.1).

The reference stack stores every medallion layer as Delta Lake tables
(ref README.md:2 "full deltalake implementation"). ``delta-spark`` is not
installed here, so this module re-creates the protocol's *shape* from
public knowledge of the Delta Lake spec — ordered commit log + immutable
parquet data files — with the three capabilities the stack exercises:

- append / overwrite writes (``write``)
- read as of any version (``read(as_of=...)`` — time travel)
- MERGE upsert (``merge`` — dbt incremental merge strategy), implemented
  as the standard full-outer-join rewrite because that is exactly what a
  sort-merge MERGE does on a cluster.

Layout::

    <path>/_log.json          ordered list of commits
    <path>/v000/...parquet    data files of commit 0
    <path>/v001/...parquet    data files of commit 1

Scale notes (100 TB): reads are plain multi-path parquet scans, so column
pruning / predicate pushdown / partition pruning all still fire; the log
is O(#commits) driver-side JSON, never shipped to executors. MERGE
shuffles both sides on the key — on a real cluster you'd bucket the
target by the merge key to make re-merges shuffle-free; with delta-spark
installed the same call maps 1:1 onto ``DeltaTable.merge``.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class DeltaLikeTable:
    def __init__(self, path: str):
        self.path = path
        self._log_path = os.path.join(path, "_log.json")

    # -- commit log -------------------------------------------------------
    def _log(self) -> list[dict]:
        if not os.path.exists(self._log_path):
            return []
        with open(self._log_path) as f:
            return json.load(f)

    def _commit(self, entry: dict) -> None:
        log = self._log()
        entry["version"] = len(log)
        log.append(entry)
        tmp = self._log_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(log, f)
        os.replace(tmp, self._log_path)  # atomic, like a Delta log commit

    @property
    def latest_version(self) -> int:
        return len(self._log()) - 1

    # -- writes -----------------------------------------------------------
    def write(self, df: DataFrame, mode: str = "append") -> int:
        """Commit ``df`` as a new version; returns the version number."""
        assert mode in ("append", "overwrite")
        version = len(self._log())
        data_dir = os.path.join(self.path, f"v{version:03d}")
        df.write.mode("overwrite").parquet(data_dir)
        self._commit({"mode": mode, "dir": f"v{version:03d}"})
        return version

    # -- reads ------------------------------------------------------------
    def read(
        self,
        spark: SparkSession,
        as_of: int | None = None,
        merge_schema: bool = False,
    ) -> DataFrame:
        """Table state at version ``as_of`` (default: latest).

        Replays the log: the live file set is every commit after (and
        including) the most recent overwrite at or before ``as_of``.
        ``merge_schema`` unions the schemas across live commits (Delta
        schema evolution: columns added by later appends surface as NULL
        for earlier files).
        """
        log = self._log()
        if as_of is not None:
            log = log[: as_of + 1]
        if not log:
            raise ValueError(f"empty table at {self.path}")
        start = 0
        for i, entry in enumerate(log):
            if entry["mode"] == "overwrite":
                start = i
        dirs = [os.path.join(self.path, e["dir"]) for e in log[start:]]
        reader = spark.read
        if merge_schema:
            reader = reader.option("mergeSchema", "true")
        return reader.parquet(*dirs)

    # -- DML --------------------------------------------------------------
    def delete(self, spark: SparkSession, condition) -> DataFrame:
        """Delta ``DELETE WHERE condition``: commit the surviving rows as
        a new overwrite version (copy-on-write, like Delta's file
        rewrite); history stays time-travelable. Returns the new state.
        """
        # Delta DELETE removes rows where the predicate is TRUE; rows where
        # it evaluates NULL are KEPT (plain ~condition would drop them).
        kept = self.read(spark).filter(~condition.eqNullSafe(True))
        self.write(kept, mode="overwrite")
        return self.read(spark)

    # -- maintenance ------------------------------------------------------
    def compact(self, spark: SparkSession, target_files: int = 1) -> int:
        """OPTIMIZE-style compaction: rewrite the live file set into
        ``target_files`` bin-packed files as a new overwrite commit.

        Content is unchanged — only the physical layout. At 100 TB this
        is the small-files cure for streaming-append tables (thousands
        of per-batch files → scan-efficient large files), run as a
        maintenance job; old versions stay readable until vacuumed.
        """
        current = self.read(spark)
        return self.write(current.coalesce(target_files), mode="overwrite")

    def vacuum(self) -> list[int]:
        """Delete data directories no longer reachable from the latest
        version (everything before the last overwrite). Returns the
        vacuumed version numbers; the log keeps their entries (marked)
        so version numbering stays stable."""
        import shutil

        log = self._log()
        start = 0
        for i, entry in enumerate(log):
            if entry["mode"] == "overwrite":
                start = i
        removed = []
        for entry in log[:start]:
            d = os.path.join(self.path, entry["dir"])
            if not entry.get("vacuumed") and os.path.exists(d):
                shutil.rmtree(d)
                removed.append(entry["version"])
            entry["vacuumed"] = True
        tmp = self._log_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(log, f)
        os.replace(tmp, self._log_path)
        return removed

    # -- MERGE (upsert) ---------------------------------------------------
    def merge(
        self,
        spark: SparkSession,
        source: DataFrame,
        on: str,
        update_cols: list[str] | None = None,
    ) -> DataFrame:
        """``MERGE INTO target USING source ON target.k = source.k
        WHEN MATCHED THEN UPDATE WHEN NOT MATCHED THEN INSERT`` —
        committed as a new overwrite version; returns the merged state.

        Full-outer-join rewrite: matched rows take source values for
        ``update_cols`` (default: all non-key columns), unmatched target
        rows pass through, unmatched source rows are inserts.
        """
        target = self.read(spark)
        cols = target.columns
        update_cols = update_cols or [c for c in cols if c != on]
        s = source.alias("s")
        tgt = target.alias("t")
        joined = tgt.join(s, F.col(f"t.{on}") == F.col(f"s.{on}"), "full_outer")
        # Matched/insert are decided by join-key presence, NOT coalesce on
        # values: WHEN MATCHED THEN UPDATE sets the column to the source
        # value even when that value is NULL, and inserted rows take source
        # values for every column the source carries.
        matched = F.col(f"s.{on}").isNotNull() & F.col(f"t.{on}").isNotNull()
        inserted = F.col(f"t.{on}").isNull()

        def _merged_col(c: str):
            s_c = (
                F.col(f"s.{c}")
                if c in source.columns
                else F.lit(None).cast(target.schema[c].dataType)
            )
            t_c = F.col(f"t.{c}")
            upd = s_c if (c in update_cols and c in source.columns) else t_c
            return (
                F.when(matched, upd).when(inserted, s_c).otherwise(t_c).alias(c)
            )

        merged = joined.select(
            F.coalesce(F.col(f"s.{on}"), F.col(f"t.{on}")).alias(on),
            *[_merged_col(c) for c in cols if c != on],
        )
        self.write(merged, mode="overwrite")
        return self.read(spark)
