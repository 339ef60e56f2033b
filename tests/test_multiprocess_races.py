"""Multi-PROCESS races on the filesystem lock protocols.

The existing race tests are thread-based (one Python process, one GIL);
these spawn real OS processes, so O_EXCL creation, rename-based stale
breaking, and atomic JSON swaps are exercised across genuinely
independent kernels of execution — the closest a single node gets to the
multi-writer cluster the commit protocol is the local twin of. No Spark:
the critical sections under test are pure metadata.
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os

from iceberg_insert_spark.sources.catalog import LocalCatalog


def _bump_counter(args):
    """Read-modify-write a counter file under the catalog lock with a
    deliberate in-lock sleep: without mutual exclusion across processes,
    increments are lost."""
    root, n_iters = args
    import time

    cat = LocalCatalog(root)
    counter = os.path.join(root, "counter.json")
    for _ in range(n_iters):
        with cat._lock():
            with open(counter) as fh:
                v = json.load(fh)["v"]
            time.sleep(0.002)  # widen the lost-update window
            with open(counter + ".tmp", "w") as fh:
                json.dump({"v": v + 1}, fh)
            os.rename(counter + ".tmp", counter)
    return True


def _create_same(args):
    root, ident = args
    try:
        LocalCatalog(root).create_table(ident)
        return "won"
    except ValueError as e:
        assert "already exists" in str(e)
        return "lost"


def _create_distinct(args):
    root, i = args
    LocalCatalog(root).create_table(f"db.t{i}")
    return i


def test_catalog_lock_mutual_exclusion_across_processes(tmp_path):
    root = str(tmp_path)
    cat = LocalCatalog(root)  # creates the root
    with open(os.path.join(root, "counter.json"), "w") as fh:
        json.dump({"v": 0}, fh)
    n_procs, n_iters = 6, 10
    with mp.Pool(n_procs) as pool:
        assert all(
            pool.map(_bump_counter, [(root, n_iters)] * n_procs)
        )
    with open(os.path.join(root, "counter.json")) as fh:
        assert json.load(fh)["v"] == n_procs * n_iters
    assert cat.list_tables() == []  # registry untouched by the probe


def test_catalog_same_identifier_race_across_processes(tmp_path):
    root = str(tmp_path)
    LocalCatalog(root).create_namespace("db")
    with mp.Pool(8) as pool:
        results = pool.map(_create_same, [(root, "db.raced")] * 8)
    assert results.count("won") == 1
    assert results.count("lost") == 7
    assert LocalCatalog(root).list_tables() == ["db.raced"]


def test_catalog_distinct_creates_across_processes_all_land(tmp_path):
    root = str(tmp_path)
    LocalCatalog(root).create_namespace("db")
    with mp.Pool(8) as pool:
        pool.map(_create_distinct, [(root, i) for i in range(16)])
    assert LocalCatalog(root).list_tables() == sorted(
        f"db.t{i}" for i in range(16)
    )


def _publish_wap(args):
    root, wap = args
    from iceberg_insert_spark.sources.snapshots import SnapshotTable
    from iceberg_insert_spark.sources.snapshots.errors import (
        CommitConflict,
    )

    try:
        return ("ok", SnapshotTable(root).publish(wap))
    except CommitConflict:
        return ("conflict", None)


def test_racing_replace_publishes_across_processes(tmp_path, spark):
    """Two OS processes publish two staged REPLACES planned against
    the same base: the commit lock + in-lock base validation admit
    exactly one; the loser gets CommitConflict and commits nothing.
    (The thread twin lives in test_snapshots; this exercises the
    O_EXCL lock file across real kernels of execution. Publish itself
    is pure metadata, so the children never need Spark.)"""
    from iceberg_insert_spark.sources.snapshots import SnapshotTable

    root = str(tmp_path / "t")
    t = SnapshotTable(root)
    for k in range(3):
        t.append(
            spark.createDataFrame(
                [(k, float(k))], "k long, v double"
            ).coalesce(1)
        )
    base = t._latest_published()
    state = t.read(spark)
    t.stage_replace(state.coalesce(1), wap_id="wa", replace_base=base)
    t.stage_replace(state.coalesce(2), wap_id="wb", replace_base=base)
    with mp.Pool(2) as pool:
        res = pool.map(_publish_wap, [(root, "wa"), (root, "wb")])
    outcomes = sorted(r[0] for r in res)
    assert outcomes == ["conflict", "ok"]
    # tie the published layout to WHICH wap won (review catch, r10:
    # 'n_files in (1, 2)' accepted either layout regardless of
    # winner): wa staged coalesce(1), wb coalesce(2)
    (widx,) = [i for i, r in enumerate(res) if r[0] == "ok"]
    winner = ("wa", "wb")[widx]
    head = t._latest_published()
    n_files = len(t._manifest(head))
    assert n_files == {"wa": 1, "wb": 2}[winner], (winner, n_files)
    assert t._raw_meta(head).get("op") == "replace"
    assert t._raw_meta(head).get("wap_id") == winner
    assert sorted(r.k for r in t.read(spark).collect()) == [0, 1, 2]
    # the loser's staged snapshot survives, reclaimable audit state
    loser = ("wa", "wb")[1 - widx]
    staged = [
        v
        for v in t.snapshots()
        if t._raw_meta(v).get("wap_id") == loser
        and t._raw_meta(v).get("op") == "stage"
    ]
    assert len(staged) == 1


def test_racing_staged_dml_publishes_across_processes(tmp_path, spark):
    """r11 twin of the replace race for STAGED ROW-LEVEL DML: two OS
    processes publish two staged CoW rewrites planned against the same
    base — the commit lock + in-lock replace_base validation admit
    exactly one; the loser conflicts and publishes nothing. The winner
    lands with its original DML op (history says what happened), the
    rows reflect exactly one statement, and the loser's staged
    snapshot survives as reclaimable audit state."""
    from pyspark.sql import functions as F

    from iceberg_insert_spark.sources.snapshots import SnapshotTable

    root = str(tmp_path / "t")
    t = SnapshotTable(root)
    t.append(
        spark.range(0, 20)
        .select(F.col("id").alias("k"), (F.col("id") % 4).alias("g"))
        .coalesce(2)
    )
    # two rewrites against the SAME base: a delete and an update
    sva = t.delete_where(spark, "g = 0", wap_id="wa")
    svb = t.update_where(spark, "g = 1", {"k": "k + 1000"}, wap_id="wb")
    assert sva is not None and svb is not None
    with mp.Pool(2) as pool:
        res = pool.map(_publish_wap, [(root, "wa"), (root, "wb")])
    outcomes = sorted(r[0] for r in res)
    assert outcomes == ["conflict", "ok"]
    (widx,) = [i for i, r in enumerate(res) if r[0] == "ok"]
    winner = ("wa", "wb")[widx]
    head = t._latest_published()
    assert t._raw_meta(head).get("wap_id") == winner
    assert t._raw_meta(head).get("op") == {
        "wa": "delete", "wb": "update",
    }[winner]
    ks = sorted(r.k for r in t.read(spark).collect())
    if winner == "wa":
        # delete g=0 landed; update didn't
        assert len(ks) == 15 and all(k % 4 != 0 for k in ks)
    else:
        # update g=1 landed; delete didn't
        assert len(ks) == 20 and sum(k >= 1000 for k in ks) == 5
    # loser's staged snapshot survives for audit / expire
    loser = ("wa", "wb")[1 - widx]
    staged = [
        v
        for v in t.snapshots()
        if t._raw_meta(v).get("wap_id") == loser
        and t._raw_meta(v).get("op") == "stage"
    ]
    assert len(staged) == 1
