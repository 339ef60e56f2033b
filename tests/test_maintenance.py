"""maintain() policy runner + SnapshotResultCache semantics."""

from __future__ import annotations

import os
import time

import pytest
from pyspark.sql import functions as F

from iceberg_insert_spark.sources.result_cache import SnapshotResultCache
from iceberg_insert_spark.sources.snapshots import SnapshotTable

from .conftest import SF_DIR


def _orders(spark):
    return spark.read.parquet(f"{SF_DIR}/orders.parquet")


def test_maintain_runs_all_actions_and_is_idempotent(spark, tmp_path):
    tbl = SnapshotTable(str(tmp_path / "t"), stats_cols=["o_orderkey"])
    o = _orders(spark)
    for m in range(5):
        tbl.append(o.filter(F.col("o_orderkey") % 5 == m).repartition(3))
    want = o.count()
    # plant crashed-writer debris old enough to sweep
    debris = str(tmp_path / "t" / "_staging-dead")
    os.makedirs(debris)
    old = time.time() - 7200
    os.utime(debris, (old, old))

    rep = tbl.maintain(
        spark, max_live_files=4, keep_last=1, orphan_grace_sec=3600
    )
    assert rep["files_before"] == 15
    assert rep["compacted_to"] is not None
    assert rep["files_after"] == 1
    assert len(rep["expired_snapshots"]) == 5  # every pre-compaction snap
    # only the replace survives, so ALL 15 small files reclaim in-pass
    assert len(rep["reclaimed_files"]) == 15
    assert any("_staging-dead" in p for p in rep["orphans_removed"])
    assert tbl.read(spark).count() == want
    assert len(tbl.snapshots()) == 1

    # second run under the same policy: every action is a no-op
    rep2 = tbl.maintain(
        spark, max_live_files=4, keep_last=1, orphan_grace_sec=3600
    )
    assert rep2["compacted_to"] is None
    assert rep2["expired_snapshots"] == []
    assert rep2["reclaimed_files"] == []
    assert rep2["orphans_removed"] == []
    assert rep2["files_before"] == rep2["files_after"] == 1
    assert tbl.read(spark).count() == want


def test_maintain_policy_validation_and_time_retention(spark, tmp_path):
    tbl = SnapshotTable(str(tmp_path / "t"))
    with pytest.raises(ValueError, match="nothing published"):
        tbl.maintain(spark)
    o = _orders(spark)
    v1 = tbl.append(o.limit(50))
    time.sleep(0.05)
    cut = time.time()
    time.sleep(0.05)
    tbl.append(o.limit(80))
    with pytest.raises(ValueError, match="not both"):
        tbl.maintain(spark, keep_last=1, expire_older_than_sec=1)
    with pytest.raises(ValueError, match=">= 1"):
        tbl.maintain(spark, keep_last=0)
    rep = tbl.maintain(
        spark,
        expire_older_than_sec=time.time() - cut,
        orphan_grace_sec=3600,
    )
    assert rep["expired_snapshots"] == [v1]


def test_result_cache_hit_invalidation_and_time_travel(spark, tmp_path):
    tbl = SnapshotTable(str(tmp_path / "t"))
    o = _orders(spark)
    v1 = tbl.append(o.filter(F.col("o_orderkey") % 2 == 0))
    cache = SnapshotResultCache(tbl, str(tmp_path / "cache"))

    calls = []

    def agg(df):
        calls.append(1)
        return df.agg(F.count(F.lit(1)).alias("n"))

    r1, hit1 = cache.get_or_compute(spark, "n", agg)
    r2, hit2 = cache.get_or_compute(spark, "n", agg)
    assert (hit1, hit2) == (False, True)
    assert len(calls) == 1  # the hit never ran compute
    n1 = r1.collect()[0]["n"]
    assert r2.collect()[0]["n"] == n1

    tbl.append(o.filter(F.col("o_orderkey") % 2 == 1))
    r3, hit3 = cache.get_or_compute(spark, "n", agg)
    assert not hit3 and len(calls) == 2
    assert r3.collect()[0]["n"] == o.count()

    # a pinned as_of read caches under its own version key and hits
    r4, hit4 = cache.get_or_compute(spark, "n", agg, as_of=v1)
    assert hit4  # same version as the first compute
    assert r4.collect()[0]["n"] == n1
    assert len(cache.entries()) == 2

    # sweep keeps the newest version per tag
    removed = cache.sweep(keep_versions=1)
    assert removed == [f"n@v{v1}"]
    _, hit5 = cache.get_or_compute(spark, "n", agg)
    assert hit5


def test_result_cache_empty_result_and_tag_rules(spark, tmp_path):
    tbl = SnapshotTable(str(tmp_path / "t"))
    tbl.append(_orders(spark).limit(10))
    cache = SnapshotResultCache(tbl, str(tmp_path / "cache"))

    def none_match(df):
        return df.filter(F.col("o_orderkey") < 0).select(
            "o_orderkey", "o_totalprice"
        )

    r1, hit1 = cache.get_or_compute(spark, "empty", none_match)
    assert not hit1 and r1.count() == 0
    r2, hit2 = cache.get_or_compute(spark, "empty", none_match)
    assert hit2 and r2.count() == 0
    assert [f.name for f in r2.schema.fields] == [
        "o_orderkey",
        "o_totalprice",
    ]
    with pytest.raises(ValueError, match="plain name"):
        cache.get_or_compute(spark, "../evil", none_match)


def test_maintain_keep_last_ignores_staged_and_branch_heads(spark, tmp_path):
    """Review regression (data-loss grade): keep_last counts PUBLISHED
    snapshots — a staged WAP commit or branch append at the newest
    version must not push the retention point past the live main head."""
    tbl = SnapshotTable(str(tmp_path / "t"))
    o = _orders(spark)
    tbl.append(o.filter(F.col("o_orderkey") % 2 == 0))
    v_main = tbl.append(o.filter(F.col("o_orderkey") % 2 == 1))
    main_count = tbl.read(spark).count()
    tbl.stage_append(o.limit(5), wap_id="audit-1")
    tbl.create_branch("b")
    tbl.append_to_branch(o.limit(3), "b")

    rep = tbl.maintain(spark, keep_last=1, orphan_grace_sec=3600)
    # the main head survives and still reads in full
    assert v_main in tbl.snapshots()
    assert tbl.read(spark).count() == main_count
    assert tbl._latest_published() == v_main
    assert v_main not in rep["expired_snapshots"]


def test_maintain_invalid_policy_commits_nothing(spark, tmp_path):
    """Review regression: policy validation runs BEFORE compaction, so a
    rejected call must not have rewritten the table."""
    tbl = SnapshotTable(str(tmp_path / "t"))
    o = _orders(spark)
    for m in range(3):
        tbl.append(o.filter(F.col("o_orderkey") % 3 == m).repartition(4))
    snaps = tbl.snapshots()
    with pytest.raises(ValueError, match="not both"):
        tbl.maintain(
            spark, max_live_files=2, keep_last=1, expire_older_than_sec=60
        )
    assert tbl.snapshots() == snaps  # no replace snapshot landed


def test_cherrypick_refuses_already_applied(spark, tmp_path):
    """Review regression (silent-duplication grade): picking a snapshot
    whose files are already on main must refuse, not double the rows."""
    tbl = SnapshotTable(str(tmp_path / "t"))
    o = _orders(spark)
    v1 = tbl.append(o.filter(F.col("o_orderkey") % 2 == 0))
    with pytest.raises(ValueError, match="already present"):
        tbl.cherrypick(v1)  # a main-ancestor append
    sv = tbl.stage_append(o.filter(F.col("o_orderkey") % 2 == 1), "w1")
    tbl.publish("w1")
    with pytest.raises(ValueError, match="already present"):
        tbl.cherrypick(sv)  # staged snapshot already published
    assert tbl.read(spark).count() == o.count()  # never doubled


def test_catalog_lock_release_only_if_still_ours(tmp_path):
    """Review regression: after a stale break hands the path to a new
    holder, the old holder's release must NOT remove the new lock."""
    from iceberg_insert_spark.sources.catalog import LocalCatalog

    cat = LocalCatalog(str(tmp_path))
    with cat._lock():
        # simulate: a breaker renamed our 'stale' lock away and a new
        # holder acquired a fresh lock at the same path
        os.remove(cat._lock_path)
        with open(cat._lock_path, "w") as fh:
            fh.write("someone-else")
    # the new holder's lock survives our release
    with open(cat._lock_path) as fh:
        assert fh.read() == "someone-else"
    os.remove(cat._lock_path)


def test_result_cache_sweep_reclaims_crashed_tmp(spark, tmp_path):
    """Review regression: crashed-writer .tmp-* dirs older than the
    grace window are reclaimed; fresh in-flight temps survive."""
    tbl = SnapshotTable(str(tmp_path / "t"))
    tbl.append(_orders(spark).limit(10))
    cache = SnapshotResultCache(tbl, str(tmp_path / "cache"))
    dead = os.path.join(cache.cache_dir, "n@v1.tmp-999-1")
    fresh = os.path.join(cache.cache_dir, "n@v1.tmp-999-2")
    os.makedirs(dead)
    os.makedirs(fresh)
    old = time.time() - 7200
    os.utime(dead, (old, old))
    removed = cache.sweep()
    assert "n@v1.tmp-999-1" in removed
    assert not os.path.exists(dead)
    assert os.path.exists(fresh)
