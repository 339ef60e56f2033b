"""Partition-spec evolution for the partitioned parquet sink — Iceberg's
hidden-partitioning evolution in miniature, the write-side counterpart of
``schema_evolution.EvolvingTable``.

The reference evaluates partition transforms by hand against ONE immutable
spec (``PartitionSpec ps = table.spec()`` App.java:85; Utile.java:14-71
dispatch) — re-partitioning an existing table means rewriting it. Iceberg's
flagship answer is spec *evolution*: the spec is versioned metadata, old
data keeps its layout, new data lands under the new one, and queries filter
on SOURCE columns — each file's own spec maps the predicate onto its
partition values. This module reproduces that contract on plain parquet:

  * every write lands under a ``_spec=N/`` directory, hive-partitioned by
    the transform columns of spec N (specs recorded as JSON sidecars in
    ``_specs/vN.json`` — Iceberg: spec-id per data file in the manifest);
  * ``evolve_spec`` is metadata-only — zero data files touched;
  * reads scan each spec directory with ITS OWN layout and union by name;
    a time-range read maps the range onto every version's partition
    columns (zero-padded formats compare lexicographically), so DIRECTORY
    PRUNING works per layout even though the caller only ever names the
    source column — hidden partitioning, exactly.

100 TB posture: the union is N parallel parquet scans (no shuffle added by
evolution); pruning happens at file-listing time per layout, so a 1-day
query over a year-long table touches ~1/365th of each spec's files. The
derived partition columns are dropped on read (reconstructable), keeping
the logical schema spec-independent.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ..tables import load_table

# transform name -> (derive expr from source col, value format for a ts)
_FORMATS = {
    "day": "yyyy-MM-dd",
    "month": "yyyy-MM",
    "hour": "yyyy-MM-dd-HH",
}


def _derive(transform: str, source: str) -> F.Column:
    if transform in _FORMATS:
        return F.date_format(source, _FORMATS[transform])
    if transform == "identity":
        return F.col(source)
    if transform.startswith("bucket["):
        n = int(transform[len("bucket[") : -1])
        return F.pmod(F.col(source), F.lit(n))
    raise ValueError(f"unknown transform: {transform}")


class PartitionEvolvingTable:
    """A parquet table whose partition spec can evolve without rewrites.

    A spec is a list of ``{"transform", "source", "name"}`` dicts.
    """

    def __init__(self, path: str):
        self.path = path
        self._spec_dir = os.path.join(path, "_specs")

    def _versions(self) -> list[int]:
        if not os.path.isdir(self._spec_dir):
            return []
        return sorted(
            int(f[1:-5])
            for f in os.listdir(self._spec_dir)
            if f.startswith("v") and f.endswith(".json")
        )

    def _spec(self, v: int) -> list[dict]:
        with open(os.path.join(self._spec_dir, f"v{v}.json")) as fh:
            return json.load(fh)

    def create(self, spec: list[dict]) -> None:
        os.makedirs(self._spec_dir, exist_ok=True)
        self._write_spec(1, spec)

    def evolve_spec(self, spec: list[dict]) -> int:
        """Metadata-only: register a new spec version; no data moves."""
        versions = self._versions()
        if not versions:
            raise ValueError(
                f"table at {self.path!r} has no spec — call create() first"
            )
        v = versions[-1] + 1
        self._write_spec(v, spec)
        return v

    def _write_spec(self, v: int, spec: list[dict]) -> None:
        for f in spec:
            _derive(f["transform"], f["source"])  # validate eagerly
        with open(os.path.join(self._spec_dir, f"v{v}.json"), "w") as fh:
            json.dump(spec, fh)

    def append(self, df: DataFrame) -> None:
        """Write under the CURRENT spec's hive layout."""
        versions = self._versions()
        if not versions:
            raise ValueError(
                f"table at {self.path!r} has no spec — call create() first"
            )
        v = versions[-1]
        spec = self._spec(v)
        out = df
        for f in spec:
            out = out.withColumn(
                f["name"], _derive(f["transform"], f["source"])
            )
        names = [f["name"] for f in spec]
        # co-locate each partition's rows before the write: one file per
        # partition dir instead of (shuffle partitions x dirs) small files
        # — the same small-files discipline as write.distribution-mode=hash
        # on the Iceberg writer (and most of this operator's wall clock).
        (
            out.repartition(*names)
            .write.mode("append")
            .partitionBy(names)
            .parquet(os.path.join(self.path, f"_spec={v}"))
        )

    def read(
        self,
        spark: SparkSession,
        time_range: tuple[str, str, str] | None = None,
    ) -> DataFrame:
        """Union of all spec layouts, partition columns dropped.

        ``time_range=(source_col, lo, hi)`` filters to lo <= col < hi AND
        maps the range onto every version's partition columns derived from
        that source, so each layout prunes directories before listing files
        — the caller never names a partition column (hidden partitioning).
        """
        parts = []
        for v in self._versions():
            d = os.path.join(self.path, f"_spec={v}")
            if not os.path.isdir(d):
                continue  # spec version never received data
            spec = self._spec(v)
            df = spark.read.parquet(d)
            if time_range is not None:
                src, lo, hi = time_range
                lo_ts = F.lit(lo).cast("timestamp_ntz")
                hi_ts = F.lit(hi).cast("timestamp_ntz")
                for f in spec:
                    if f["source"] != src or f["transform"] not in _FORMATS:
                        continue
                    fmt = _FORMATS[f["transform"]]
                    # zero-padded formats order lexicographically, so the
                    # inclusive string range [fmt(lo), fmt(hi)] is a sound
                    # superset of the exact range -> safe directory pruning
                    df = df.filter(
                        F.col(f["name"]).between(
                            F.date_format(lo_ts, fmt),
                            F.date_format(hi_ts, fmt),
                        )
                    )
                df = df.filter(
                    (F.col(src) >= lo_ts) & (F.col(src) < hi_ts)
                )
            parts.append(df.drop(*[f["name"] for f in spec]))
        if not parts:
            raise ValueError(
                f"table at {self.path!r} has no data files under any spec "
                "version — append() before read()"
            )
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out


@query(
    "q_part_evolution",
    oracle="""
    SELECT event_type,
           STRFTIME(ts, '%Y-%m-%d') AS day,
           COUNT(*) AS n_events,
           COUNT(DISTINCT user_id) AS n_users
    FROM events
    WHERE ts >= TIMESTAMP '2024-01-10 00:00:00'
      AND ts <  TIMESTAMP '2024-01-20 00:00:00'
    GROUP BY 1, 2
    """,
)
def q_part_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end partition-spec evolution round-trip, DuckDB-oracled.

    The classic evolution direction — the table started too coarse and
    re-partitions finer as volume grows: events before Jan 16 were written
    MONTH-partitioned (spec v1); the spec then evolves to DAY — metadata-
    only, zero files rewritten — and later data lands under v2. The read
    names ONLY the source column ``ts``: the time range maps onto ts_month
    under v1 and ts_day under v2 for directory pruning (asserted in
    tests/test_partition_evolution.py), and the unioned rows must be
    indistinguishable from querying the raw table — which is exactly what
    the oracle does.
    """
    from ..tables import scratch_dir

    path = scratch_dir(spark, sf_dir, "part_evolve")

    ev = load_table(spark, sf_dir, "events")
    split = F.lit("2024-01-16").cast("timestamp_ntz")
    tbl = PartitionEvolvingTable(path)
    tbl.create([{"transform": "month", "source": "ts", "name": "ts_month"}])
    tbl.append(ev.filter(F.col("ts") < split))
    tbl.evolve_spec([{"transform": "day", "source": "ts", "name": "ts_day"}])
    tbl.append(ev.filter(F.col("ts") >= split))
    return (
        tbl.read(
            spark,
            time_range=("ts", "2024-01-10 00:00:00", "2024-01-20 00:00:00"),
        )
        .groupBy("event_type", F.date_format("ts", "yyyy-MM-dd").alias("day"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
        )
    )
