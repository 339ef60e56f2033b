"""Incremental reads and the CDC changelog over SnapshotTable.

Shared by the batch queries, the streaming sources, and the incremental
MV refresher."""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .core import SnapshotTable



def _validate_range(
    tbl: SnapshotTable,
    from_v: int,
    to_v: int,
    allowed: tuple,
    what: str,
) -> None:
    """Shared guard for the two CDC readers (review catch: duplicated
    guards diverge): both snapshots must exist, the range must be
    forward (swapped bounds would silently read as 'no changes'), and
    every commit inside it must be one of ``allowed`` — manifest
    set-difference math is only meaningful over append-shaped history
    (overwrite/replace/rollback rewrite visibility wholesale; evolve
    changes the schema mid-range; merge deltas are changelogs, which
    only ``read_changelog`` understands). Legacy-manifest ops are
    inferred by ``history()``."""
    snaps = tbl.snapshots()
    for v in (from_v, to_v):
        if v not in snaps:
            raise ValueError(
                f"snapshot {v} does not exist (have {snaps})"
            )
    if from_v >= to_v:
        raise ValueError(
            f"{what} needs from_v < to_v (got {from_v} >= {to_v})"
        )
    ops = dict(tbl.history())
    for w in snaps:
        if from_v < w <= to_v:
            op = ops.get(w, "append")
            if op not in allowed:
                raise ValueError(
                    f"{what} crosses a {op!r} commit (snapshot {w}); "
                    "read full snapshots instead"
                )


def _read_incremental(
    tbl: SnapshotTable, spark: SparkSession, from_v: int, to_v: int
) -> DataFrame:
    """Iceberg INCREMENTAL APPEND SCAN (the CDC-read primitive behind
    `incremental-from-snapshot` / changelog reads): the rows added after
    snapshot ``from_v`` up to ``to_v`` are exactly the files in
    manifest(to_v) minus manifest(from_v) — pure manifest arithmetic,
    no data diffing, valid because append commits never rewrite files.
    At 100 TB an incremental consumer (downstream ETL, streaming
    backfill) reads only the delta files instead of rescanning the
    table."""
    # branch-append snapshots are off-main (their files never enter a
    # main manifest, so the set-difference is untouched); fast_forward
    # is append-shaped by its own precondition (main cannot have moved
    # between the fork and the merge, so earlier main manifests are
    # subsets of the merged one).
    _validate_range(
        tbl, from_v, to_v,
        allowed=("append", "publish", "stage", "branch-append",
                 "fast_forward", "rewrite_manifests"),
        what="incremental append scan",
    )
    new_files = sorted(
        set(tbl._manifest(to_v)) - set(tbl._manifest(from_v))
    )
    if not new_files:
        return tbl.read(spark, as_of=to_v).limit(0)
    return spark.read.parquet(
        *[os.path.join(tbl.path, f) for f in new_files]
    )


def read_changelog(
    tbl: SnapshotTable, spark: SparkSession, from_v: int, to_v: int
) -> DataFrame:
    """CDC CHANGELOG READ (Iceberg's ``create_changelog_view``) — the
    inverse of ``merge``: the row-level changes between two snapshots as
    '(row image, _change_type)' rows, where an update appears as its
    DELETE (old image) + INSERT (new image) pair, exactly Iceberg's
    changelog semantics.

    Pure manifest arithmetic plus two bounded scans:

      * INSERTS = the range's new data files, read through ``to_v``'s
        merge-on-read machinery restricted to those files — so a row
        appended AND deleted inside the range is correctly suppressed
        (its data seq < the delete's seq), while a merge's own
        re-inserts survive (seq equality);
      * DELETES = the range's delete-file keys (broadcast) joined
        against the ``from_v`` state for the OLD images — a key that
        never existed at ``from_v`` (added and removed inside the
        range) produces no delete row.

    The range must contain only append/publish/merge commits
    (overwrite/rollback/replace rewrite visibility wholesale and evolve
    changes the schema mid-range — both refuse, like the incremental
    append scan). At 100 TB a downstream consumer pays O(delta files) +
    one broadcast join against the old state's matching keys — never a
    diff of two full table scans.
    """
    _validate_range(
        tbl, from_v, to_v,
        allowed=("append", "publish", "merge", "stage", "branch-append",
                 "fast_forward", "rewrite_manifests"),
        what="changelog read",
    )
    ct = F.lit("insert").alias("_change_type")
    new_files = sorted(
        set(tbl._manifest(to_v)) - set(tbl._manifest(from_v))
    )
    if new_files:
        ins = tbl._read_files(spark, to_v, new_files).select(
            "*", ct
        )
    else:
        ins = tbl.read(spark, as_of=to_v).select("*", ct).limit(0)
    range_dels = [
        d
        for d in tbl._meta(to_v).get("delete_files", [])
        if from_v < d["seq"] <= to_v
    ]
    # Equality deletes ONLY, checked explicitly (advisor catch, r7):
    # _validate_range happens to refuse the 'delete'/'update' ops that
    # produce pos/DV entries today, but that is an implicit invariant —
    # a future allowed-op addition (e.g. a DV-carrying merge) would
    # otherwise surface as an opaque KeyError on d["key"] below. A
    # pos/DV entry has no key column to join old images by, so the
    # changelog genuinely cannot represent it.
    other = [d for d in range_dels if d.get("kind", "eq") != "eq"]
    if other:
        raise ValueError(
            "changelog cannot represent positional/deletion-vector "
            f"delete commits in range (snapshots "
            f"{sorted({d['seq'] for d in other})}); read full "
            "snapshots instead"
        )
    if not range_dels:
        return ins
    keys = {d["key"] for d in range_dels}
    if len(keys) != 1:
        raise ValueError(f"mixed equality-delete keys {sorted(keys)}")
    key = keys.pop()
    from functools import reduce

    delkeys = reduce(
        DataFrame.unionAll,
        [
            spark.read.parquet(os.path.join(tbl.path, d["path"])).select(
                key
            )
            for d in range_dels
        ],
    ).distinct()
    old = tbl.read(spark, as_of=from_v)
    del_rows = old.join(F.broadcast(delkeys), key, "left_semi").select(
        "*", F.lit("delete").alias("_change_type")
    )
    return ins.unionByName(del_rows)
