"""Iceberg v3 ROW LINEAGE on the snapshot table: every row carries a
stable ``_row_id`` (minted at first commit as seq * 2^40 + position,
MATERIALIZED into rewritten files so compaction and copy-on-write
rewrites never re-identify a row) and ``_last_updated_seq`` (the commit
sequence that last modified it — bumped by UPDATE, preserved by
layout-only rewrites). Plain reads hide the machinery entirely.

The DuckDB-oracled round trip is q_snapshot_row_lineage; these tests
pin the lifecycle edges."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from iceberg_insert_spark.sources.snapshots import SnapshotTable


def _one_file(df):
    return df.repartition(1).sortWithinPartitions(df.columns[0])


def _lin(spark, t, as_of=None):
    return {
        r.k: (r._row_id, r._last_updated_seq)
        for r in t.read(spark, as_of=as_of, lineage=True).collect()
    }


def _mk(spark, tmp_path, name="t"):
    t = SnapshotTable(str(tmp_path / name), row_lineage=True)
    t.append(
        _one_file(
            spark.createDataFrame(
                [(1, 10.0), (2, 20.0), (3, 30.0)], "k int, v double"
            )
        )
    )
    return t


def test_ids_minted_per_commit_and_hidden_by_default(spark, tmp_path):
    t = _mk(spark, tmp_path)
    t.append(_one_file(spark.createDataFrame([(4, 40.0)], "k int, v double")))
    lin = _lin(spark, t)
    assert lin[1] == (1 << 40, 1)
    assert lin[2] == ((1 << 40) + 1, 1)
    assert lin[4] == (2 << 40, 2)
    assert t.read(spark).columns == ["k", "v"]  # machinery hidden
    # ids are unique
    assert len({rid for rid, _ in lin.values()}) == 4


def test_compact_preserves_ids_and_last_seq(spark, tmp_path):
    t = _mk(spark, tmp_path)
    t.append(_one_file(spark.createDataFrame([(4, 40.0)], "k int, v double")))
    before = _lin(spark, t)
    t.compact(spark)
    assert _lin(spark, t) == before
    # and again through a z-order rewrite
    t.compact_zorder(spark, "k", "v", target_files=2)
    assert _lin(spark, t) == before


def test_cow_update_bumps_only_matched_rows(spark, tmp_path):
    t = _mk(spark, tmp_path)
    before = _lin(spark, t)
    v = t.update_where(spark, "k = 2", {"v": "v + 1"})
    after = _lin(spark, t)
    assert after[1] == before[1] and after[3] == before[3]
    assert after[2][0] == before[2][0]  # same identity
    assert after[2][1] == v  # modified at the update's sequence
    # delete: survivors untouched
    t.delete_where(spark, "k = 1")
    final = _lin(spark, t)
    assert set(final) == {2, 3}
    assert final[2] == after[2] and final[3] == after[3]


def test_mor_update_preserves_ids_like_cow(spark, tmp_path):
    """MoR UPDATE (deletion vector + new images) must honor the same
    Iceberg v3 lineage rule as the CoW path: the updated row KEEPS its
    ``_row_id`` (materialized into the new image — its file would
    otherwise mint a fresh virtual identity) and its
    ``_last_updated_seq`` becomes the update commit (materialized NULL
    resolving to the commit sequence at read time). Advisor catch, r7:
    the MoR path silently minted fresh ids."""
    t = _mk(spark, tmp_path)
    before = _lin(spark, t)
    v = t.update_where(spark, "k = 2", {"v": "v + 1"}, strategy="mor")
    after = _lin(spark, t)
    assert after[1] == before[1] and after[3] == before[3]
    assert after[2][0] == before[2][0]  # same identity
    assert after[2][1] == v  # modified at the update's sequence
    # values actually updated through the DV fold
    vals = {r.k: r.v for r in t.read(spark).collect()}
    assert vals[2] == 21.0
    # compaction folds the DV and must keep the materialized lineage
    t.compact(spark)
    assert _lin(spark, t) == after


def test_time_travel_lineage_and_rollback(spark, tmp_path):
    t = _mk(spark, tmp_path)
    v1 = t._latest_published()
    t.update_where(spark, "k = 3", {"v": "0.0"})
    old = _lin(spark, t, as_of=v1)
    assert old[3][1] == 1  # pre-update sequence
    t.rollback(v1)
    assert _lin(spark, t) == old


def test_merge_reinsert_is_a_new_row(spark, tmp_path):
    t = _mk(spark, tmp_path)
    before = _lin(spark, t)
    chg = spark.createDataFrame(
        [(2, 99.0, "U"), (9, 90.0, "I")], "k int, v double, _op string"
    )
    mv = t.merge(spark, chg, key="k")
    after = _lin(spark, t)
    # MoR update = delete old image + insert new image: the new image
    # is a NEW row (v3 lineage under equality deletes), at the merge seq
    assert after[2][0] != before[2][0]
    assert after[2][1] == mv and after[9][1] == mv
    assert after[1] == before[1] and after[3] == before[3]


def test_reserved_names_refused_when_lineage_off(spark, tmp_path):
    t = SnapshotTable(str(tmp_path / "off"))
    bad = spark.createDataFrame(
        [(1, 5)], "k int, __iis_row_id long"
    )
    with pytest.raises(ValueError, match="row-lineage"):
        t.append(bad)


def test_flag_inherited_and_composes_with_rename(spark, tmp_path):
    t = _mk(spark, tmp_path)
    # a default handle inherits the recorded flag
    t2 = SnapshotTable(str(tmp_path / "t"))
    assert t2._lineage_on()
    before = _lin(spark, t2)
    # metadata-only DDL never disturbs identity
    t2.rename_column("v", "val")
    t2.compact(spark)
    after = {
        r.k: (r._row_id, r._last_updated_seq)
        for r in t2.read(spark, lineage=True).collect()
    }
    assert after == before


def test_staged_txn_update_preserves_lineage(spark, tmp_path):
    """r11 staged DML x row lineage: a transactional UPDATE keeps
    every row's _row_id through the CoW rewrite (Iceberg v3's 'row id
    survives update' rule, same as the immediate path) and stamps
    updated rows' _last_updated_seq STRICTLY AFTER the pre-transaction
    head — the staged snapshot's own version, which no incremental
    consumer watermark can sit past before the publish lands (only
    published versions are watermarks, and publish validates the head
    never moved)."""
    from iceberg_insert_spark.sources.catalog import LocalCatalog

    cat = LocalCatalog(str(tmp_path / "cat"))
    cat.create_namespace("db")
    cat.create_table("db.t", row_lineage=True)
    t = cat.load_table("db.t")
    t.append(
        _one_file(
            spark.createDataFrame(
                [(1, 10.0), (2, 20.0), (3, 30.0)], "k int, v double"
            )
        )
    )
    pre_head = t._latest_published()
    before = _lin(spark, t)
    txn = cat.begin_transaction()
    txn.update_where(spark, "db.t", "k <= 2", {"v": "v + 1.0"})
    txn.commit()
    t2 = cat.load_table("db.t")
    after = _lin(spark, t2)
    # ids preserved row-for-row, updated and untouched alike
    assert {k: rid for k, (rid, _s) in after.items()} == {
        k: rid for k, (rid, _s) in before.items()
    }
    # updated rows' last-seq strictly after the pre-txn head;
    # untouched rows keep their original stamp
    assert after[1][1] > pre_head and after[2][1] > pre_head
    assert after[3][1] == before[3][1]
    vals = {r.k: r.v for r in t2.read(spark).collect()}
    assert vals == {1: 11.0, 2: 21.0, 3: 30.0}
