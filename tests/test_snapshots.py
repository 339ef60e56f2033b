"""Snapshot append / time travel / expire (sources/snapshots.py): the
manifest-driven read contract Iceberg provides and the reference's
one-snapshot-per-file commit loop (App.java:147-149) cannot."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from iceberg_insert_spark.sources.snapshots import SnapshotTable
from iceberg_insert_spark.tables import load_table

from .conftest import SF_DIR


def _build(spark, tmp_path):
    o = load_table(spark, SF_DIR, "orders")
    tbl = SnapshotTable(str(tmp_path / "t"))
    for r in range(3):
        tbl.append(o.filter(F.col("o_orderkey") % 3 == r))
    return o, tbl


def test_every_snapshot_remains_readable(spark, tmp_path):
    o, tbl = _build(spark, tmp_path)
    assert tbl.snapshots() == [1, 2, 3]
    for v in (1, 2, 3):
        want = o.filter(F.col("o_orderkey") % 3 < v).count()
        assert tbl.read(spark, as_of=v).count() == want
    # default read = latest
    assert tbl.read(spark).count() == o.count()


def test_historic_read_ignores_later_appends(spark, tmp_path):
    """VERSION AS OF must be stable: a snapshot's row set cannot change
    when later appends land."""
    o, tbl = _build(spark, tmp_path)
    before = {r.o_orderkey for r in tbl.read(spark, as_of=1).collect()}
    tbl.append(o.limit(0))  # empty append still makes a snapshot
    tbl.append(o.filter(F.col("o_orderkey") % 3 == 0))  # duplicate data
    after = {r.o_orderkey for r in tbl.read(spark, as_of=1).collect()}
    assert before == after
    assert tbl.snapshots() == [1, 2, 3, 4, 5]


def test_expire_deletes_only_unreferenced_files(spark, tmp_path):
    """expireSnapshots semantics: dropping old snapshots must delete files
    no surviving manifest references — and ONLY those. Appends inherit
    every earlier file (nothing deletable); an OVERWRITE snapshot breaks
    the inheritance chain, and expiring past it reclaims the replaced
    files."""
    o, tbl = _build(spark, tmp_path)
    # appends only: every v1 file is inherited by v2/v3 -> nothing deletable
    assert tbl.expire(keep_from=2) == []
    assert tbl.snapshots() == [2, 3]
    assert tbl.read(spark, as_of=2).count() == o.filter(
        F.col("o_orderkey") % 3 < 2
    ).count()
    with pytest.raises(ValueError, match="does not exist"):
        tbl.read(spark, as_of=1)

    # overwrite (compaction shape): snapshot 4 references ONLY its own
    # files, but time travel to 2/3 still sees the pre-overwrite data
    v = tbl.overwrite(tbl.read(spark).limit(100))
    assert v == 4
    assert tbl.read(spark, as_of=4).count() == 100
    assert tbl.read(spark, as_of=3).count() == o.count()

    # expiring past the overwrite reclaims every replaced file
    doomed = tbl.expire(keep_from=4)
    assert doomed, "overwrite must make the old files expirable"
    for f in doomed:
        assert not os.path.exists(os.path.join(str(tmp_path / "t"), f))
    assert tbl.snapshots() == [4]
    assert tbl.read(spark, as_of=4).count() == 100


def test_empty_table_read_is_descriptive(spark, tmp_path):
    tbl = SnapshotTable(str(tmp_path / "never"))
    with pytest.raises(ValueError, match="no snapshots"):
        tbl.read(spark)
