"""Sources & sinks: file-format ingest (CSV/JSON/parquet), partitioned
parquet sinks, and the Delta-protocol-shaped versioned storage layer
(SURVEY.md §2.1).

``delta-spark`` is not installed in this environment (SURVEY.md §7.1), so
the Delta surface (append / time travel / MERGE) is provided by
``deltalike.DeltaLikeTable`` — a parquet-files-plus-JSON-log layout that
follows the published Delta Lake protocol shape (data files + ordered log
of commits) without the Delta binary dependencies. The operator layer only
sees ``write/read/merge``, so swapping in real ``delta-spark`` on a
cluster is a one-module change.
"""
