"""Snapshot-keyed query result cache over :class:`SnapshotTable` —
Snowflake-style result reuse made CORRECT by construction: a cache entry is
keyed by (query tag, snapshot version), and snapshots are immutable, so a
hit can never serve stale data — any commit moves the table to a new
version and naturally misses. No TTLs, no invalidation protocol, no
read-your-writes hazard: the table's own commit sequence IS the
invalidation.

At 100 TB this is the difference between re-scanning the table for every
dashboard refresh and serving repeated aggregations from a KB-scale cached
result; the cache write is one extra parquet dump of the (small) result,
published atomically by directory rename so concurrent computers race
safely (first rename wins, losers discard their temp and serve the
winner's entry — the same commit contract as the table's manifests).
"""

from __future__ import annotations

import json
import os
import shutil
import threading

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..registry import query
from ..tables import exact_sum, load_table, scratch_dir
from .snapshots import SnapshotTable


class SnapshotResultCache:
    """Result cache bound to one table; entries live under ``cache_dir``."""

    def __init__(self, table: SnapshotTable, cache_dir: str):
        self.table = table
        self.cache_dir = cache_dir
        os.makedirs(cache_dir, exist_ok=True)

    def _entry_path(self, tag: str, v: int) -> str:
        if "/" in tag or tag.startswith("."):
            raise ValueError(f"cache tag {tag!r} must be a plain name")
        return os.path.join(self.cache_dir, f"{tag}@v{v}")

    @staticmethod
    def _read_entry(spark: SparkSession, path: str) -> DataFrame:
        # Empty results write no part files — the schema sidecar written
        # before publish makes them readable as a typed empty frame.
        if any(f.endswith(".parquet") for f in os.listdir(path)):
            return spark.read.parquet(path)
        with open(os.path.join(path, "_schema.json")) as fh:
            schema = T.StructType.fromJson(json.load(fh))
        return spark.createDataFrame([], schema)

    def get_or_compute(
        self,
        spark: SparkSession,
        tag: str,
        compute,
        as_of: int | None = None,
    ) -> tuple[DataFrame, bool]:
        """Return ``(result, hit)``. ``compute(df)`` receives the table
        read AT the resolved snapshot and returns the result frame; it
        runs only on a miss. Time-travel reads (``as_of``) cache under
        their own version key — an old dashboard pinned to snapshot N
        and the live view never collide."""
        v = self.table._resolve_snapshot(as_of)
        path = self._entry_path(tag, v)
        if os.path.isdir(path):
            return self._read_entry(spark, path), True
        result = compute(self.table.read(spark, as_of=v))
        tmp = f"{path}.tmp-{os.getpid()}-{threading.get_ident()}"
        result.write.mode("overwrite").parquet(tmp)
        with open(os.path.join(tmp, "_schema.json"), "w") as fh:
            json.dump(result.schema.jsonValue(), fh)
        try:
            os.rename(tmp, path)
        except OSError:
            # another computer published first; serve the winner
            shutil.rmtree(tmp, ignore_errors=True)
        return self._read_entry(spark, path), False

    def entries(self) -> list[str]:
        return sorted(
            e
            for e in os.listdir(self.cache_dir)
            if "@v" in e and ".tmp-" not in e
        )

    def sweep(
        self, keep_versions: int = 1, tmp_grace_sec: float = 3600.0
    ) -> list[str]:
        """Space reclaim (correctness never needs it): per tag, keep the
        entries for the ``keep_versions`` newest cached versions and
        remove the rest — old entries are still CORRECT (their snapshots
        are immutable) but typically unreachable once dashboards move to
        the live view. Also reclaims crashed-writer ``.tmp-*`` dirs
        (died between the parquet write and the publish rename) older
        than ``tmp_grace_sec`` — the grace window keeps an IN-FLIGHT
        computer's temp alive, same contract as remove_orphan_files."""
        import time

        by_tag: dict[str, list[tuple[int, str]]] = {}
        for e in self.entries():
            tag, _, v = e.rpartition("@v")
            by_tag.setdefault(tag, []).append((int(v), e))
        removed = []
        for pairs in by_tag.values():
            pairs.sort(reverse=True)
            for _, e in pairs[keep_versions:]:
                shutil.rmtree(
                    os.path.join(self.cache_dir, e), ignore_errors=True
                )
                removed.append(e)
        cutoff = time.time() - tmp_grace_sec
        for e in os.listdir(self.cache_dir):
            if ".tmp-" not in e:
                continue
            p = os.path.join(self.cache_dir, e)
            try:
                if os.path.getmtime(p) < cutoff:
                    shutil.rmtree(p, ignore_errors=True)
                    removed.append(e)
            except FileNotFoundError:
                pass
        return sorted(removed)


@query(
    "q_snapshot_cached_read",
    oracle="""
    SELECT o_orderstatus,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS DOUBLE)
               / 100.0 AS sum_price,
           CAST(0 AS BIGINT) AS first_hit,
           CAST(1 AS BIGINT) AS second_hit,
           CAST(0 AS BIGINT) AS third_hit
    FROM orders
    GROUP BY o_orderstatus
    """,
)
def q_snapshot_cached_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot-keyed result caching, DuckDB-oracled end to end: the same
    tagged aggregation runs three times — compute (miss), replay (HIT,
    served from the cached parquet without touching table data), then a
    new append moves the snapshot and the third run MISSES and recomputes
    over the grown table. The final result must equal DuckDB's fresh
    aggregation over all of orders — proving the post-invalidation
    recompute saw the appended rows — and the hit/miss sequence rides
    along as oracled constants.

    Scale shape: a hit reads a KB-scale cached result instead of
    re-scanning the table; the key is (tag, snapshot version), so
    correctness is structural — immutable snapshots can't go stale, and
    commits invalidate by moving the version, never by a protocol.
    """
    path = scratch_dir(spark, sf_dir, "cached_read")
    o = load_table(spark, sf_dir, "orders")
    tbl = SnapshotTable(os.path.join(path, "t"))
    tbl.append(o.filter(F.col("o_orderkey") % 4 != 3))
    cache = SnapshotResultCache(tbl, os.path.join(path, "cache"))

    def agg(df: DataFrame) -> DataFrame:
        return df.groupBy("o_orderstatus").agg(
            F.count(F.lit(1)).alias("n_orders"),
            exact_sum(F.col("o_totalprice"), 2).alias("sum_price"),
        )

    _, hit1 = cache.get_or_compute(spark, "by_status", agg)
    _, hit2 = cache.get_or_compute(spark, "by_status", agg)
    tbl.append(o.filter(F.col("o_orderkey") % 4 == 3))
    final, hit3 = cache.get_or_compute(spark, "by_status", agg)
    return (
        final.withColumn("first_hit", F.lit(int(hit1)).cast("long"))
        .withColumn("second_hit", F.lit(int(hit2)).cast("long"))
        .withColumn("third_hit", F.lit(int(hit3)).cast("long"))
    )
