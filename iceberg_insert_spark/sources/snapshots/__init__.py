"""Snapshot tables: the package form of the original sources/snapshots.py.

The module path ``iceberg_insert_spark.sources.snapshots`` is unchanged —
every public name re-exports from the submodules (split r7 for review
velocity; no behavior change):

  errors       CommitConflict
  core         SnapshotTable (assembled from the five mixins below)
  stats        scan planning, stats/Bloom sidecars, the read path
  commit       commit protocol, locking, append/overwrite, WAP
  ddl          schema / partition-spec / constraint DDL
  dml          MERGE / DELETE / UPDATE / add_files
  maintenance  refs, rollback, compaction, expire, clone, forget
  incremental  incremental reads + the CDC changelog
  queries, queries_dml  the registered q_snapshot_* query surface
"""

from .core import CommitConflict, SnapshotTable
from .incremental import (  # noqa: F401
    _read_incremental,
    _validate_range,
    read_changelog,
)
from .queries import *  # noqa: F401,F403  (registers lifecycle queries)
from .queries_dml import *  # noqa: F401,F403  (registers DML/stream queries)

__all__ = ["SnapshotTable", "CommitConflict", "read_changelog"]
