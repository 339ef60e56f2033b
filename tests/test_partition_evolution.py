"""Partition-spec evolution: layout parity, hidden-partition pruning, and
the metadata-only evolve guarantee (sources/partition_evolution.py)."""

from __future__ import annotations

import glob
import os

from pyspark.sql import functions as F

from iceberg_insert_spark.sources.partition_evolution import (
    PartitionEvolvingTable,
)
from iceberg_insert_spark.tables import load_table

from .conftest import SF_DIR


def _build(spark, tmp_path):
    ev = load_table(spark, SF_DIR, "events")
    split = F.lit("2024-01-16").cast("timestamp_ntz")
    tbl = PartitionEvolvingTable(str(tmp_path / "t"))
    tbl.create([{"transform": "month", "source": "ts", "name": "ts_month"}])
    tbl.append(ev.filter(F.col("ts") < split))
    tbl.evolve_spec([{"transform": "day", "source": "ts", "name": "ts_day"}])
    tbl.append(ev.filter(F.col("ts") >= split))
    return ev, tbl


def test_read_is_layout_invisible(spark, tmp_path):
    """The unioned read must be row-identical to the source table and keep
    the source schema (derived partition columns dropped)."""
    ev, tbl = _build(spark, tmp_path)
    back = tbl.read(spark)
    assert back.count() == ev.count()
    assert sorted(back.columns) == sorted(ev.columns)
    # spot-check exact row survival incl. ts fidelity
    a = {r.event_id: r.ts for r in back.filter(F.col("event_id") < 50).collect()}
    b = {r.event_id: r.ts for r in ev.filter(F.col("event_id") < 50).collect()}
    assert a == b


def test_time_range_prunes_both_layouts(spark, tmp_path):
    """A time-range read names only the SOURCE column; each spec version
    must still get a partition-column filter (ts_month on v1, ts_day on
    v2) so directory pruning happens per layout."""
    _, tbl = _build(spark, tmp_path)
    df = tbl.read(
        spark, time_range=("ts", "2024-01-10 00:00:00", "2024-01-12 00:00:00")
    )
    jvm = df.sparkSession._jvm
    p = df._jdf.queryExecution().explainString(
        jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    part_lines = [ln for ln in p.splitlines() if "PartitionFilters" in ln]
    assert sum("ts_month" in ln for ln in part_lines) == 1
    assert sum("ts_day" in ln for ln in part_lines) == 1
    # and the pruned read returns exactly the range's rows
    ev = load_table(spark, SF_DIR, "events")
    lo = F.lit("2024-01-10").cast("timestamp_ntz")
    hi = F.lit("2024-01-12").cast("timestamp_ntz")
    assert df.count() == ev.filter((F.col("ts") >= lo) & (F.col("ts") < hi)).count()


def test_evolve_is_metadata_only(spark, tmp_path):
    """evolve_spec must not touch existing data files."""
    ev, tbl = _build(spark, tmp_path)
    files_before = sorted(
        glob.glob(str(tmp_path / "t" / "_spec=1" / "**" / "*.parquet"),
                  recursive=True)
    )
    mtimes_before = [os.path.getmtime(f) for f in files_before]
    tbl.evolve_spec(
        [{"transform": "month", "source": "ts", "name": "ts_month"}]
    )
    files_after = sorted(
        glob.glob(str(tmp_path / "t" / "_spec=1" / "**" / "*.parquet"),
                  recursive=True)
    )
    assert files_after == files_before
    assert [os.path.getmtime(f) for f in files_after] == mtimes_before
    # a spec version with no data contributes nothing and breaks nothing
    assert tbl.read(spark).count() == ev.count()


def test_bucket_and_identity_transforms(spark, tmp_path):
    """The non-temporal transforms (identity, bucket[N]) write and read
    back layout-invisibly too — evolution isn't day/month-specific."""
    ev = load_table(spark, SF_DIR, "events")
    tbl = PartitionEvolvingTable(str(tmp_path / "t2"))
    tbl.create(
        [{"transform": "identity", "source": "event_type", "name": "et"}]
    )
    half = ev.filter(F.col("event_id") % 2 == 0)
    rest = ev.filter(F.col("event_id") % 2 == 1)
    tbl.append(half)
    tbl.evolve_spec(
        [{"transform": "bucket[8]", "source": "user_id", "name": "ub"}]
    )
    tbl.append(rest)
    back = tbl.read(spark)
    assert back.count() == ev.count()
    assert sorted(back.columns) == sorted(ev.columns)
    # bucket dirs: exactly pmod(user_id, 8) values 0..7
    import glob as _g

    dirs = {p.split("=")[-1] for p in
            _g.glob(str(tmp_path / "t2" / "_spec=2" / "ub=*"))}
    assert dirs <= {str(i) for i in range(8)}
    assert len(dirs) > 1


def test_unknown_transform_rejected_eagerly(tmp_path):
    """A bad spec must fail at evolve time (metadata validation), not at
    the first append."""
    import pytest

    tbl = PartitionEvolvingTable(str(tmp_path / "t3"))
    with pytest.raises(ValueError, match="unknown transform"):
        tbl.create([{"transform": "fortnight", "source": "ts", "name": "x"}])


def test_empty_table_errors_are_descriptive(spark, tmp_path):
    """A never-created table fails append/evolve with a clear message, and
    a created-but-never-appended table fails read the same way — never a
    bare IndexError (round-3 ADVICE)."""
    import pytest

    bare = PartitionEvolvingTable(str(tmp_path / "never_created"))
    with pytest.raises(ValueError, match="no spec"):
        bare.evolve_spec(
            [{"transform": "identity", "source": "x", "name": "x"}]
        )
    with pytest.raises(ValueError, match="no spec"):
        bare.append(spark.range(1))

    created = PartitionEvolvingTable(str(tmp_path / "no_data"))
    created.create(
        [{"transform": "identity", "source": "id", "name": "id_p"}]
    )
    with pytest.raises(ValueError, match="no data files"):
        created.read(spark)
