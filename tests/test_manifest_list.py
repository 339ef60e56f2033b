"""Two-level manifest metadata (Iceberg spec v1 §Manifests, r7 verdict
missing #1): every snapshot's ``vN.json`` is a MANIFEST LIST referencing
immutable manifest files, commits REUSE unchanged manifests by reference
(O(delta) metadata IO instead of re-serializing the live file inventory),
and partition probes prune WHOLE manifests from the list's [min, max]
summaries before any file entry is read.

The oracled round trip is q_snapshot_manifest_pruning; these tests pin
the mechanics: reuse, drop-rewrite, summary pruning soundness, expire's
manifest-file GC, and flat-legacy compatibility."""

from __future__ import annotations

import json
import os

import pytest

from iceberg_insert_spark.sources.snapshots import SnapshotTable


def _raw(tbl, v):
    with open(os.path.join(tbl._mdir, f"v{v}.json")) as fh:
        return json.load(fh)


def _mf_names(tbl, v):
    return [m["path"] for m in _raw(tbl, v)["manifest_list"]]


def _df(spark, rows, schema="k long, v double"):
    return spark.createDataFrame(rows, schema)


def test_appends_reuse_prior_manifests_o_delta(spark, tmp_path):
    """Each append writes exactly ONE new manifest file and reuses every
    prior one BY REFERENCE: commit N's list = commit N-1's refs + one.
    This is the metadata contract that keeps a CDC stream's commit cost
    flat instead of quadratic over its life."""
    t = SnapshotTable(str(tmp_path / "t"))
    for i in range(5):
        t.append(_df(spark, [(i, float(i))]))
    for v in range(1, 6):
        names = _mf_names(t, v)
        assert len(names) == v
        if v > 1:
            assert names[:-1] == _mf_names(t, v - 1)  # verbatim reuse
        # the new manifest holds ONLY this commit's files
        new_mf = names[-1]
        ents = t._load_mf(new_mf)
        assert all(e["p"].startswith(f"_snap={v}") for e in ents)
    # expanded view is unchanged vs the flat contract: every file of
    # every manifest, in list order, with counts matching summaries
    assert len(t._manifest(5)) == sum(
        m["n"] for m in _raw(t, 5)["manifest_list"]
    )
    assert t.read(spark).count() == 5


def test_cow_delete_rewrites_only_affected_manifest(spark, tmp_path):
    """A CoW delete drops files from ONE manifest: that manifest is
    rewritten (its survivors + the commit's new files land in the delta
    manifest); every untouched manifest carries by reference."""
    t = SnapshotTable(str(tmp_path / "t"))
    for i in range(4):
        t.append(
            _df(spark, [(i * 10 + j, float(j)) for j in range(3)])
            .repartition(1)
        )
    before = _mf_names(t, 4)
    v = t.delete_where(spark, "k = 21")  # touches only commit 3's file
    names = _mf_names(t, v)
    # commits 1, 2, 4's manifests reused; 3's replaced by the delta
    assert before[0] in names and before[1] in names
    assert before[3] in names
    assert before[2] not in names
    assert t.read(spark).count() == 11
    rows = {r.k for r in t.read(spark).collect()}
    assert 21 not in rows and 20 in rows and 22 in rows


def test_manifest_summary_prunes_whole_manifests(spark, tmp_path):
    """Partition probes skip manifests from the list's [min, max]
    summaries alone: a probe outside a manifest's recorded value range
    never reads its entries, and the planned file set is IDENTICAL to
    the per-file pruning result (summaries only skip, never change
    semantics)."""
    t = SnapshotTable(
        str(tmp_path / "t"),
        partition_by=["day"],
        write_distribution="hash",
    )
    for day in ("2024-01-01", "2024-01-02", "2024-01-03"):
        t.append(
            spark.createDataFrame(
                [(i, day) for i in range(4)], "k long, day string"
            )
        )
    head = max(t.snapshots())
    rep = t.plan_manifests(partitions={"day": "2024-01-01"}, as_of=head)
    assert rep["manifests_total"] == 3
    assert rep["manifests_pruned"] == 2  # the two other days' manifests
    assert rep["files_after_manifest_prune"] == 1
    # planned set == per-file semantics == actual rows
    files, total = t.plan_files(
        partitions={"day": "2024-01-01"}, as_of=head
    )
    assert total == 3 and len(files) == 1
    got = t.read(spark, partitions={"day": "2024-01-01"}).count()
    assert got == 4
    # no probe: nothing pruned
    rep0 = t.plan_manifests(as_of=head)
    assert rep0 == {
        "manifests_total": 3,
        "manifests_pruned": 0,
        "files_total": 3,
        "files_after_manifest_prune": 3,
    }


def test_expire_reclaims_unreferenced_manifest_files(spark, tmp_path):
    """expire() removes manifest files no surviving list references —
    dropped-snapshot manifests and crash-window orphans — and keeps
    every referenced one readable."""
    t = SnapshotTable(str(tmp_path / "t"))
    for i in range(3):
        t.append(_df(spark, [(i, float(i))]))
    t.overwrite(_df(spark, [(99, 9.9)]))  # v4: drops all prior files
    # plant a crash-window orphan (manifest written, list swap died)
    orphan = os.path.join(t._mdir, "m-77-0.json")
    with open(orphan, "w") as fh:
        json.dump({"entries": [{"p": "_snap=77/x.parquet"}]}, fh)
    t.expire(keep_from=4)
    left = {
        n for n in os.listdir(t._mdir)
        if n.startswith("m-") and n.endswith(".json")
    }
    assert left == set(_mf_names(t, 4))
    assert not os.path.exists(orphan)
    assert t.read(spark).count() == 1


def test_flat_legacy_manifest_reads_and_upgrades(spark, tmp_path):
    """A pre-r8 FLAT manifest (files inline in vN.json) keeps reading
    unchanged, and the next commit upgrades the table to the two-level
    form (paying the one-time full manifest write)."""
    t = SnapshotTable(str(tmp_path / "t"))
    t.append(_df(spark, [(1, 1.0)]))
    # rewrite v1 into the legacy flat form
    raw = _raw(t, 1)
    flat = {k: v for k, v in raw.items() if k not in ("manifest_list", "fp")}
    flat["files"] = t._manifest(1)
    for name in _mf_names(t, 1):
        os.remove(os.path.join(t._mdir, name))
    with open(os.path.join(t._mdir, "v1.json"), "w") as fh:
        json.dump(flat, fh)
    assert t.read(spark).count() == 1
    n = len(t._manifest(1))
    assert t.plan_manifests() == {
        "manifests_total": 1,
        "manifests_pruned": 0,
        "files_total": n,
        "files_after_manifest_prune": n,
    }
    v = t.append(_df(spark, [(2, 2.0)]))
    assert "manifest_list" in _raw(t, v)
    assert t.read(spark).count() == 2
    assert t.read(spark, as_of=1).count() == 1


def test_summary_pruning_is_equality_sound_for_numeric_strings(
    spark, tmp_path
):
    """Lexicographic [min, max] bounds on hive-encoded strings are only
    used for EQUALITY probes, where they are sound regardless of the
    column's numeric semantics: a probe inside the lexicographic range
    but absent from the set is kept at the manifest tier and pruned at
    the file tier — never a wrong result."""
    t = SnapshotTable(
        str(tmp_path / "t"),
        partition_by=["b"],
        write_distribution="hash",
    )
    # '10' < '9' lexicographically — the classic numeric-string trap
    t.append(
        spark.createDataFrame([(1, 10), (2, 9)], "k long, b int")
    )
    t.append(
        spark.createDataFrame([(3, 2), (4, 3)], "k long, b int")
    )
    head = max(t.snapshots())
    # b=9 is lexicographically INSIDE ['10','9'] and OUTSIDE ['2','3']
    rep = t.plan_manifests(partitions={"b": 9}, as_of=head)
    assert rep["manifests_pruned"] == 1
    assert {r.k for r in t.read(spark, partitions={"b": 9}).collect()} == {2}
    # b=5: lexicographically inside ['2','3']..? '5' > '3' -> pruned;
    # inside ['10','9'] -> kept at manifest tier, file tier empties it
    files, _ = t.plan_files(partitions={"b": 5}, as_of=head)
    assert t.read(spark, partitions={"b": 5}).count() == 0


def test_small_manifests_merge_bounds_the_list(spark, tmp_path):
    """Iceberg's manifest-merge policy: runs of >= MIN_TO_MERGE
    consecutive small manifests rewrite into one, so a one-manifest-
    per-commit append stream keeps the manifest LIST bounded (not one
    reference per commit forever) while the expanded view and the rows
    stay identical."""
    t = SnapshotTable(str(tmp_path / "t"))
    n_commits = 20
    for i in range(n_commits):
        t.append(_df(spark, [(i, float(i))]).coalesce(1))
    head = max(t.snapshots())
    names = _mf_names(t, head)
    # without merging this would be 20 refs; with MIN_TO_MERGE=8 each
    # merge collapses a run, keeping the list strictly below the
    # commit count
    assert len(names) < SnapshotTable.MANIFEST_MIN_TO_MERGE + 4
    assert sum(m["n"] for m in _raw(t, head)["manifest_list"]) == len(
        t._manifest(head)
    )
    assert t.read(spark).count() == n_commits
    assert {r.k for r in t.read(spark).collect()} == set(range(n_commits))
    # historic snapshots still read through their own (pre-merge) lists
    assert t.read(spark, as_of=7).count() == 7


def test_rollback_and_branch_reuse(spark, tmp_path):
    """Metadata-only commits (rollback) reuse the target's manifests by
    reference — zero manifest-entry IO however large the table."""
    t = SnapshotTable(str(tmp_path / "t"))
    for i in range(3):
        t.append(_df(spark, [(i, float(i))]))
    v = t.rollback(to=2)
    assert _mf_names(t, v) == _mf_names(t, 2)  # pure reference copy
    assert t.read(spark).count() == 2


def test_plan_row_groups_skips_inside_an_unprunable_file(spark, tmp_path):
    """plan_row_groups (r7 verdict #5): one large file SORTED on k whose
    file-level [min, max] spans the whole domain — file pruning keeps it
    — but a narrow range probe must skip most of its row groups from
    footer stats alone. An unsorted twin skips none. Conservative rule
    pinned: a column with no stats reads everything."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    n = 10_000
    src = str(tmp_path / "import")
    os.makedirs(src)
    tbl_sorted = pa.table(
        {"k": list(range(n)), "v": [float(i) for i in range(n)]}
    )
    pq.write_table(
        tbl_sorted, os.path.join(src, "sorted.parquet"),
        row_group_size=1000,
    )
    t = SnapshotTable(str(tmp_path / "t"), stats_cols=["k"])
    t.add_files(spark, [os.path.join(src, "sorted.parquet")])
    rep = t.plan_row_groups(("k", 4200, 4800))
    assert rep["files_total"] == 1 and rep["files_pruned"] == 0
    assert rep["n_groups"] == 10
    # groups [4000,5000) and... 4200-4800 touches exactly group 4
    assert rep["groups_skipped"] == 9
    assert rep["rows_must_read"] == 1000
    assert rep["rows_in_kept_files"] == n
    # identical rows either way — the report never changes semantics
    assert (
        t.read(spark, where=("k", 4200, 4800)).count() == 601
    )
    # shuffled twin: every group spans the domain, nothing skips
    import random

    rng = random.Random(7)
    ks = list(range(n))
    rng.shuffle(ks)
    pq.write_table(
        pa.table({"k": ks, "v": [float(i) for i in ks]}),
        os.path.join(src, "shuffled.parquet"),
        row_group_size=1000,
    )
    t2 = SnapshotTable(str(tmp_path / "t2"), stats_cols=["k"])
    t2.add_files(spark, [os.path.join(src, "shuffled.parquet")])
    rep2 = t2.plan_row_groups(("k", 4200, 4800))
    assert rep2["n_groups"] == 10 and rep2["groups_skipped"] == 0
    assert rep2["rows_must_read"] == n


def test_rewrite_manifests_repacks_and_preserves_reads(spark, tmp_path):
    """rewrite_manifests(): a burst of small commits leaves many tiny
    manifests; the procedure repacks every entry into target-sized
    fresh manifests as ONE metadata-only commit — rows, partition
    records, and time travel unchanged; historic snapshots keep their
    old manifests until expire; subsequent commits reuse the repacked
    layout."""
    t = SnapshotTable(
        str(tmp_path / "t"),
        partition_by=["g"],
        write_distribution="hash",
    )
    for i in range(6):
        t.append(
            spark.createDataFrame(
                [(i * 10 + j, f"g{i}") for j in range(3)],
                "k long, g string",
            )
        )
    before = t.manifests_info()
    assert len(before) > 1
    v = t.rewrite_manifests()
    after = t.manifests_info()
    assert len(after) == 1
    assert after[0]["n_entries"] == sum(m["n_entries"] for m in before)
    assert dict(t.history())[v] == "rewrite_manifests"
    # semantics untouched
    assert t.read(spark).count() == 18
    assert t.read(spark, partitions={"g": "g2"}).count() == 3
    assert t.read(spark, as_of=v - 1).count() == 18  # time travel OK
    # incremental/changelog consumers cross the repack (empty delta)
    from iceberg_insert_spark.sources.snapshots import read_changelog

    assert read_changelog(t, spark, v - 1, v).count() == 0
    # the next append reuses the repacked manifest by reference
    t.append(spark.createDataFrame([(99, "g9")], "k long, g string"))
    names = [m["path"] for m in t.manifests_info()]
    assert after[0]["path"] in names
