"""Snapshot append + time travel on plain parquet — the THIRD leg of the
repo's Iceberg-metadata reproduction, next to schema evolution
(schema_evolution.EvolvingTable) and partition-spec evolution
(partition_evolution.PartitionEvolvingTable).

The reference commits one Iceberg snapshot per data file (App.java:147-149)
and can only ever read "latest". Iceberg's actual table format makes every
commit a SNAPSHOT — an immutable manifest of data files — and any historic
snapshot remains readable (time travel: ``VERSION AS OF`` /
``TIMESTAMP AS OF``). This module reproduces that contract locally:

  * ``append`` writes data files under ``_snap=N/`` and records a manifest
    JSON (``_manifests/vN.json``) listing EVERY file visible at snapshot N
    (its own plus all inherited ones) — reads never list directories, they
    read the manifest, exactly like Iceberg's metadata-driven planning;
  * ``read(as_of=N)`` hands Spark the manifest's file list — a historic
    read costs the same planning work as "latest" and needs no directory
    state to survive (files are immutable, append-only);
  * ``expire(keep_from)`` drops manifests older than a snapshot and
    deletes data files no surviving manifest references — Iceberg's
    ``expireSnapshots`` maintenance, with the same referenced-files
    reachability rule.

100 TB posture: manifests hold file PATHS (KBs per thousand files), so
snapshot bookkeeping is metadata-only however large the data; a read plans
from one JSON read + a parquet scan of exactly the listed files — no
directory walk over an ever-growing table root.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ..tables import exact_sum, load_table


class SnapshotTable:
    """Append-only parquet table with Iceberg-style snapshot manifests."""

    def __init__(self, path: str):
        self.path = path
        self._mdir = os.path.join(path, "_manifests")

    def snapshots(self) -> list[int]:
        if not os.path.isdir(self._mdir):
            return []
        return sorted(
            int(f[1:-5])
            for f in os.listdir(self._mdir)
            if f.startswith("v") and f.endswith(".json")
        )

    def _manifest(self, v: int) -> list[str]:
        with open(os.path.join(self._mdir, f"v{v}.json")) as fh:
            return json.load(fh)["files"]

    def _commit(
        self, df: DataFrame, inherit: bool, token: str | None = None
    ) -> int:
        os.makedirs(self._mdir, exist_ok=True)
        snaps = self.snapshots()
        v = (snaps[-1] + 1) if snaps else 1
        d = os.path.join(self.path, f"_snap={v}")
        df.write.mode("error").parquet(d)
        new_files = sorted(
            os.path.join(f"_snap={v}", f)
            for f in os.listdir(d)
            if f.endswith(".parquet")
        )
        inherited = (
            self._manifest(snaps[-1]) if (inherit and snaps) else []
        )
        # Atomic metadata swap (Iceberg's commit contract): a manifest must
        # never be observable half-written, so write to a temp name and
        # os.rename() into place — rename is atomic on POSIX, so readers see
        # either no v{N}.json or a complete one.
        final = os.path.join(self._mdir, f"v{v}.json")
        tmp = final + ".tmp"
        meta: dict = {"files": inherited + new_files}
        if token is not None:
            meta["token"] = token
        with open(tmp, "w") as fh:
            json.dump(meta, fh)
        os.rename(tmp, final)
        return v

    def _token(self, v: int) -> str | None:
        with open(os.path.join(self._mdir, f"v{v}.json")) as fh:
            return json.load(fh).get("token")

    def append_once(self, df: DataFrame, token: str) -> int:
        """IDEMPOTENT append: commit a snapshot tagged with ``token``
        unless one already carries it — Iceberg's commit-dedup idiom
        (write.spark.commit-id / WAP id) that turns foreachBatch's
        AT-LEAST-ONCE replay into exactly-once: a replayed micro-batch
        finds its batch-id token already committed and becomes a no-op
        instead of double-appending. Returns the (existing or new)
        snapshot version."""
        for v in self.snapshots():
            if self._token(v) == token:
                return v
        return self._commit(df, inherit=True, token=token)

    def append(self, df: DataFrame) -> int:
        """Write a new snapshot: data files under ``_snap=N/`` plus a
        manifest listing every file visible at N (inherited + new)."""
        return self._commit(df, inherit=True)

    def overwrite(self, df: DataFrame) -> int:
        """REPLACE the table contents in a new snapshot: the manifest
        lists only the new files; prior files stay on disk, referenced
        only by OLDER manifests — so time travel still reaches them until
        ``expire`` reclaims them. This is the commit type (Iceberg
        overwrite / rewrite-compaction) that makes snapshot expiry
        actually delete data: an append-only history references every
        file from every surviving manifest forever."""
        return self._commit(df, inherit=False)

    def read(self, spark: SparkSession, as_of: int | None = None) -> DataFrame:
        """Read the table as of snapshot ``as_of`` (default: latest). The
        file list comes from the manifest, never a directory walk."""
        snaps = self.snapshots()
        if not snaps:
            raise ValueError(
                f"table at {self.path!r} has no snapshots — append() first"
            )
        v = snaps[-1] if as_of is None else as_of
        if v not in snaps:
            raise ValueError(
                f"snapshot {v} does not exist (have {snaps}) — expired or "
                "never committed"
            )
        files = [os.path.join(self.path, f) for f in self._manifest(v)]
        return spark.read.parquet(*files)

    def expire(self, keep_from: int) -> list[str]:
        """Drop snapshots older than ``keep_from`` and delete data files no
        surviving manifest references. Returns the deleted files."""
        snaps = self.snapshots()
        keep = [v for v in snaps if v >= keep_from]
        drop = [v for v in snaps if v < keep_from]
        if not keep:
            raise ValueError("expire would delete every snapshot")
        referenced = {f for v in keep for f in self._manifest(v)}
        doomed = sorted(
            {f for v in drop for f in self._manifest(v)} - referenced
        )
        # Remove the dropped manifests FIRST, then their now-unreferenced
        # data files: a crash in between leaves orphaned data files (safe —
        # a re-run of expire or any GC can reclaim them) rather than live
        # manifests pointing at deleted files (a corrupt table where
        # read(as_of=dropped) dies with a missing-file error instead of the
        # clean "does not exist" error).
        for v in drop:
            os.remove(os.path.join(self._mdir, f"v{v}.json"))
        for f in doomed:
            p = os.path.join(self.path, f)
            if os.path.exists(p):
                os.remove(p)
        return doomed


@query(
    "q_time_travel",
    oracle="""
    SELECT o_orderstatus,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS DOUBLE)
               / 100.0 AS sum_price
    FROM orders
    WHERE o_orderkey % 3 < 2
    GROUP BY o_orderstatus
    """,
)
def q_time_travel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot time travel, DuckDB-oracled end-to-end: orders land in
    three append snapshots (keys %3 = 0, then 1, then 2); the query reads
    VERSION AS OF snapshot 2 and aggregates — so the result must equal the
    oracle's reconstruction over keys %3 < 2, and must NOT see the third
    append even though its files are on disk when the read plans. The
    history/expire machinery is pinned in tests/test_snapshots.py.
    """
    from ..tables import scratch_dir

    path = scratch_dir(spark, sf_dir, "time_travel")

    o = load_table(spark, sf_dir, "orders")
    tbl = SnapshotTable(path)
    for r in range(3):
        tbl.append(o.filter(F.col("o_orderkey") % 3 == r))
    return (
        tbl.read(spark, as_of=2)
        .groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            exact_sum(F.col("o_totalprice"), 2).alias("sum_price"),
        )
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
    snaps = tbl.snapshots()
    for v in (from_v, to_v):
        if v not in snaps:
            raise ValueError(f"snapshot {v} does not exist (have {snaps})")
    new_files = sorted(
        set(tbl._manifest(to_v)) - set(tbl._manifest(from_v))
    )
    if not new_files:
        return tbl.read(spark, as_of=to_v).limit(0)
    return spark.read.parquet(
        *[os.path.join(tbl.path, f) for f in new_files]
    )


@query(
    "q_snapshot_incremental",
    oracle="""
    SELECT o_orderstatus,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS DOUBLE)
               / 100.0 AS sum_price
    FROM orders
    WHERE o_orderkey % 3 >= 1
    GROUP BY o_orderstatus
    """,
)
def q_snapshot_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental append scan, DuckDB-oracled end-to-end: orders land in
    three append snapshots (keys %3 = 0, then 1, then 2); the query reads
    the DELTA between snapshot 1 and snapshot 3 — which must equal the
    oracle's reconstruction over keys %3 >= 1, proving the manifest
    set-difference yields exactly the appended rows (and nothing from the
    base snapshot). The q_time_travel sibling reads a historic VERSION;
    this reads a version RANGE — together they cover Iceberg's two
    metadata-driven read modes.
    """
    from ..tables import scratch_dir

    path = scratch_dir(spark, sf_dir, "snap_incremental")
    o = load_table(spark, sf_dir, "orders")
    tbl = SnapshotTable(path)
    for r in range(3):
        tbl.append(o.filter(F.col("o_orderkey") % 3 == r))
    return (
        _read_incremental(tbl, spark, 1, 3)
        .groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            exact_sum(F.col("o_totalprice"), 2).alias("sum_price"),
        )
    )
