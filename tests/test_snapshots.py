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


def test_snapshot_ingest_exactly_once(spark, tmp_path):
    """Streaming ingest into SnapshotTable: every micro-batch becomes a
    time-travelable snapshot; append_once makes replayed batches no-ops
    (exactly-once output); restarting the finished stream commits
    nothing new."""
    import json as _json

    from iceberg_insert_spark.sources.json_ingest import (
        EVENTS_JSON_SCHEMA,
        write_fixture,
    )
    from iceberg_insert_spark.streaming.file_stream import (
        snapshot_ingest_available_now,
    )

    base = write_fixture(str(tmp_path / "landing"), n_rows=120)
    table_dir = str(tmp_path / "snap_table")
    ckpt = str(tmp_path / "ckpt")
    tbl = snapshot_ingest_available_now(
        spark, f"{base}/events/*/", EVENTS_JSON_SCHEMA, table_dir, ckpt
    )
    snaps = tbl.snapshots()
    assert len(snaps) >= 1
    total = tbl.read(spark).count()
    # 120 rows minus the ~2% malformed (i % 50 == 49 -> ids 49, 99)
    assert total == 118
    # each snapshot prefix is a consistent historic state
    prev = 0
    for v in snaps:
        n = tbl.read(spark, as_of=v).count()
        assert n >= prev
        prev = n
    assert prev == total

    # replay: appending the same batch token again must be a no-op
    first_token = tbl._token(snaps[0])
    assert first_token is not None
    ev = spark.read.schema(EVENTS_JSON_SCHEMA).json(f"{base}/events/*/")
    v_again = tbl.append_once(ev, token=first_token)
    assert v_again == snaps[0]
    assert tbl.snapshots() == snaps
    assert tbl.read(spark).count() == total

    # restart the finished stream: checkpoint says no new input -> no
    # new snapshots
    tbl2 = snapshot_ingest_available_now(
        spark, f"{base}/events/*/", EVENTS_JSON_SCHEMA, table_dir, ckpt
    )
    assert tbl2.snapshots() == snaps
    assert tbl2.read(spark).count() == total

    # manifests are valid JSON with tokens (atomic-rename contract)
    import os

    mdir = os.path.join(table_dir, "_manifests")
    manifests = [
        f for f in os.listdir(mdir)
        if f.startswith("v") and f.endswith(".json")
    ]
    assert manifests
    for f in manifests:
        raw = _json.loads(open(os.path.join(mdir, f)).read())
        assert raw["token"].startswith("batch-")
        # two-level form: the list references immutable manifest files;
        # the expanded view still lists every visible data file
        v = int(f[1:-5])
        assert tbl2._meta(v)["files"]


def test_expire_crash_window_leaves_table_consistent(spark, tmp_path):
    """expire() removes dropped manifests BEFORE deleting unreferenced
    data files (round-5 advice fix), so a crash in between leaves only
    harmless ORPHANED data files — never a live manifest pointing at
    deleted files. Simulate the crash state and prove every surviving
    read works, the dropped snapshot fails with the clean error, and
    cleanup is recoverable."""
    import os

    import pytest as _pytest

    from iceberg_insert_spark.sources.snapshots import SnapshotTable

    tbl = SnapshotTable(str(tmp_path / "t"))
    df = spark.range(10).withColumnRenamed("id", "k")
    tbl.append(df.filter("k < 5"))
    tbl.overwrite(df.filter("k >= 5"))  # snap 1's files now unreferenced
    tbl.append(df.filter("k < 2"))
    assert tbl.snapshots() == [1, 2, 3]

    # crash-window state: the dropped manifest is gone, its data files
    # are NOT (expire removes manifests first)
    os.remove(os.path.join(tbl._mdir, "v1.json"))
    orphan_dir = os.path.join(tbl.path, "_snap=1")
    assert os.path.isdir(orphan_dir)  # orphans on disk

    # every surviving snapshot still reads fine
    assert tbl.read(spark, as_of=2).count() == 5
    assert tbl.read(spark, as_of=3).count() == 7
    # the dropped snapshot raises the clean does-not-exist error, not a
    # missing-file read failure
    with _pytest.raises(ValueError, match="does not exist"):
        tbl.read(spark, as_of=1)
    # recovery: a later expire still works on the surviving history
    assert tbl.expire(keep_from=2) == []
    assert tbl.snapshots() == [2, 3]


def test_history_records_operations(spark, tmp_path):
    """history() is the `table.history` metadata read: one (id, op) row
    per surviving snapshot, from manifest JSON only; expire drops rows;
    pre-`op` manifests get their operation inferred from the file
    list."""
    import json

    o, tbl = _build(spark, tmp_path)
    tbl.overwrite(o.filter(F.col("o_orderkey") % 5 == 0))
    assert tbl.history() == [
        (1, "append"), (2, "append"), (3, "append"), (4, "overwrite"),
    ]
    tbl.expire(keep_from=3)
    assert tbl.history() == [(3, "append"), (4, "overwrite")]
    # Legacy manifests (written before the op field existed) have their
    # operation inferred from the file list: v3 (append) references
    # earlier _snap dirs; v4 (overwrite) references only its own.
    for v in (3, 4):
        m = os.path.join(str(tmp_path / "t"), "_manifests", f"v{v}.json")
        with open(m) as fh:
            meta = json.load(fh)
        del meta["op"]
        with open(m, "w") as fh:
            json.dump(meta, fh)
    assert tbl.history() == [(3, "append"), (4, "overwrite")]


def test_rollback_restores_visibility_keeps_history(spark, tmp_path):
    """rollback commits a NEW snapshot pointing at the old file list:
    latest equals the rollback target row-for-row, the bad snapshot
    stays time-travelable for audit, and expire can then reclaim it."""
    o, tbl = _build(spark, tmp_path)
    bad = tbl.overwrite(o.filter(F.col("o_orderkey") % 5 == 0))
    v = tbl.rollback(to=3)
    assert v == 5 and tbl.history()[-1] == (5, "rollback")
    assert tbl.read(spark).count() == o.count()
    # the bad snapshot is still auditable...
    assert tbl.read(spark, as_of=bad).count() == o.filter(
        F.col("o_orderkey") % 5 == 0
    ).count()
    # ...until expired; the rollback snapshot shares v3's files, so
    # expiring everything before v5 must NOT delete what v5 references.
    tbl.expire(keep_from=5)
    assert tbl.read(spark).count() == o.count()
    with pytest.raises(ValueError, match="does not exist"):
        tbl.read(spark, as_of=bad)
    # rolling back to an expired snapshot is a clean error
    with pytest.raises(ValueError, match="does not exist"):
        tbl.rollback(to=1)


def test_compact_rewrites_layout_not_rows(spark, tmp_path):
    """compact shrinks the visible file count without changing rows;
    pre-compaction snapshots keep their small files until expire."""
    o = load_table(spark, SF_DIR, "orders")
    tbl = SnapshotTable(str(tmp_path / "t"))
    for r in range(3):
        tbl.append(o.filter(F.col("o_orderkey") % 3 == r).repartition(4))
    before = len(tbl._manifest(3))
    assert before == 12
    rows_before = tbl.read(spark).count()
    v = tbl.compact(spark)
    assert tbl.history()[-1] == (v, "replace")
    assert len(tbl._manifest(v)) == 1
    assert tbl.read(spark).count() == rows_before
    # pre-compaction snapshot unchanged, still 12 files
    assert len(tbl._manifest(3)) == before
    assert tbl.read(spark, as_of=3).count() == rows_before
    # expire reclaims the 12 small files, compacted read unaffected
    deleted = tbl.expire(keep_from=v)
    assert len(deleted) == 12
    assert tbl.read(spark).count() == rows_before


def test_wap_stage_isolation_publish_idempotent(spark, tmp_path):
    """Staged snapshots are invisible to main reads until publish;
    publish is a metadata-only cherry-pick, idempotent on wap_id;
    unpublished staged work is expirable."""
    o = load_table(spark, SF_DIR, "orders")
    tbl = SnapshotTable(str(tmp_path / "t"))
    tbl.append(o.filter(F.col("o_orderkey") % 3 == 0))
    main_rows = tbl.read(spark).count()
    v_staged = tbl.stage_append(
        o.filter(F.col("o_orderkey") % 3 == 1), wap_id="w1"
    )
    # isolation: main unchanged; audit read sees base + staged batch
    assert tbl.read(spark).count() == main_rows
    staged_rows = tbl.read(spark, as_of=v_staged).count()
    assert staged_rows == o.filter(F.col("o_orderkey") % 3 < 2).count()
    assert tbl.history()[-1] == (v_staged, "stage")
    # publish fast-forwards main; idempotent on wap_id
    v_pub = tbl.publish("w1")
    assert tbl.read(spark).count() == staged_rows
    assert tbl.publish("w1") == v_pub
    assert tbl.history()[-1] == (v_pub, "publish")
    with pytest.raises(ValueError, match="no staged"):
        tbl.publish("nope")


def test_wap_rejected_stage_is_expirable(spark, tmp_path):
    """The audit-failed path: a staged snapshot that is never published
    is reclaimed by expire without touching main's files."""
    o = load_table(spark, SF_DIR, "orders")
    tbl = SnapshotTable(str(tmp_path / "t"))
    tbl.append(o.filter(F.col("o_orderkey") % 3 == 0))
    tbl.stage_append(o.filter(F.col("o_orderkey") % 3 == 1), wap_id="bad")
    main_rows = tbl.read(spark).count()
    v_fix = tbl.append(o.filter(F.col("o_orderkey") % 3 == 2))
    deleted = tbl.expire(keep_from=v_fix)
    assert deleted  # the staged batch's files are gone
    assert tbl.read(spark).count() == main_rows + o.filter(
        F.col("o_orderkey") % 3 == 2
    ).count()


def test_all_staged_table_read_is_descriptive(spark, tmp_path):
    o = load_table(spark, SF_DIR, "orders")
    tbl = SnapshotTable(str(tmp_path / "t"))
    tbl.stage_append(o.limit(5), wap_id="w1")
    with pytest.raises(ValueError, match="only staged"):
        tbl.read(spark)


def test_publish_cherry_picks_onto_moved_main(spark, tmp_path):
    """Main-branch commits landing between stage and publish must
    survive the publish: publish applies the staged snapshot's OWN
    files onto main as it is NOW (Iceberg cherrypick), never a frozen
    manifest copy — and a staged snapshot must not be a rollback
    target (that would bypass the audit gate)."""
    o = load_table(spark, SF_DIR, "orders")
    tbl = SnapshotTable(str(tmp_path / "t"))
    tbl.append(o.filter(F.col("o_orderkey") % 3 == 0))           # A
    v_staged = tbl.stage_append(
        o.filter(F.col("o_orderkey") % 3 == 1), wap_id="w1"       # B
    )
    tbl.append(o.filter(F.col("o_orderkey") % 3 == 2))           # C
    with pytest.raises(ValueError, match="staged"):
        tbl.rollback(to=v_staged)
    tbl.publish("w1")
    # A + C + B — C did not vanish, B landed once
    assert tbl.read(spark).count() == o.count()


def test_stats_pruning_correct_and_conservative(spark, tmp_path):
    """plan_files prunes exactly the stats-disjoint files; pruned reads
    return the same rows as unpruned filtered reads; files without
    stats are conservatively kept; expire trims the sidecar."""
    o = load_table(spark, SF_DIR, "orders")
    mx = o.agg(F.max("o_orderkey")).collect()[0][0]
    b1, b2 = mx // 3, 2 * mx // 3
    tbl = SnapshotTable(str(tmp_path / "t"), stats_cols=["o_orderkey"])
    k = F.col("o_orderkey")
    tbl.append(o.filter(k <= b1).coalesce(1))
    tbl.append(o.filter((k > b1) & (k <= b2)).coalesce(1))
    tbl.append(o.filter(k > b2).coalesce(1))

    where = ("o_orderkey", b1 + 1, b2)
    kept, total = tbl.plan_files(where=where)
    assert total == 3 and len(kept) == 1
    want = o.filter((k > b1) & (k <= b2)).count()
    assert tbl.read(spark, where=where).count() == want
    # a predicate spanning two tertiles keeps two files
    kept2, _ = tbl.plan_files(where=("o_orderkey", b1 + 1, mx))
    assert len(kept2) == 2
    # no-stats table: nothing pruned, same rows
    tbl2 = SnapshotTable(str(tmp_path / "u"))  # no stats_cols
    tbl2.append(o.filter(k <= b1).coalesce(1))
    tbl2.append(o.filter(k > b1).coalesce(1))
    kept3, total3 = tbl2.plan_files(where=("o_orderkey", 1, 1))
    assert (len(kept3), total3) == (2, 2)
    # stats survive commit types that add no files (rollback), and
    # expire trims sidecar entries for reclaimed files
    tbl.overwrite(o.filter(k <= b1).coalesce(1))
    v = tbl.snapshots()[-1]
    deleted = tbl.expire(keep_from=v)
    assert deleted
    stats = tbl._load_stats()
    assert set(stats) == set(tbl._manifest(v))
    # all-pruned predicate: empty result, schema intact
    out = tbl.read(spark, where=("o_orderkey", mx + 10, mx + 20))
    assert out.count() == 0 and "o_totalprice" in out.columns


def test_lifecycle_model_randomized(spark, tmp_path):
    """Model-based check of the WHOLE snapshot lifecycle: a seeded
    random sequence of append / overwrite / stage / publish / rollback
    / compact / expire runs against both the real SnapshotTable and a
    pure-Python visibility model (sets of row ids per snapshot). After
    every operation, latest-published visibility and history ops must
    match the model; at the end, every surviving snapshot's rows match.
    Catches cross-operation interactions no single-op test covers
    (e.g. the stage-inherit and frozen-publish bugs found this round)."""
    import random

    rng = random.Random(20260814)
    # stats + blooms on: every commit type records sidecar entries, so
    # the eq-probe invariant below exercises bloom/null pruning across
    # the whole op mix (and expire's sidecar trims)
    tbl = SnapshotTable(
        str(tmp_path / "t"),
        stats_cols=["rid"],
        bloom_cols=["rid"],
    )

    def batch(ids):
        return spark.createDataFrame(
            [(int(i),) for i in ids], "rid long"
        ).coalesce(1)

    # model state
    vis: dict[int, frozenset] = {}  # snapshot -> visible row ids
    ops: dict[int, str] = {}
    staged: dict[str, tuple[int, frozenset]] = {}  # wap -> (v, own rows)
    branches: dict[str, dict] = {}  # name -> {head, fork, appends}
    own_rows: dict[int, frozenset] = {}  # branch-append snap -> its rows
    picked: set[int] = set()  # cherry-picked sources
    absorbed: set[int] = set()  # branch appends fast-forwarded into main
    published: list[int] = []
    next_id = 0
    wap_n = 0
    branch_n = 0

    def fresh(n):
        nonlocal next_id
        ids = frozenset(range(next_id, next_id + n))
        next_id += n
        return ids

    def trim_model(keep):
        """Model mirror of expire(keep_from=keep) — ONE spelling shared
        by the maintain and expire arms (review catch: two copies of
        the retention-trim logic silently diverge)."""
        nonlocal published, staged
        pinned = {b["head"] for b in branches.values()}
        for dv in [dv for dv in vis if dv < keep and dv not in pinned]:
            del vis[dv]
            ops.pop(dv, None)
        published[:] = [v for v in published if v >= keep or v in pinned]
        staged = {
            w: (sv, so)
            for w, (sv, so) in staged.items()
            if sv >= keep or sv in pinned
        }

    evolve_n = 0
    for step in range(28):
        choices = ["append", "overwrite", "stage"]
        if staged:
            choices.append("publish")
        if len(published) >= 2:
            choices += ["rollback", "expire"]
        if published:
            choices += ["compact", "evolve", "create_branch", "delete"]
            if vis[published[-1]]:
                # maintain's forced compaction needs a non-empty head
                # (files_before > 0); an all-rows delete can empty it
                choices.append("maintain")
        if branches:
            choices += ["branch_append", "fast_forward", "drop_branch"]
        if published and any(
            v in vis and v not in picked and v not in absorbed
            for v in own_rows
        ):
            choices.append("cherrypick")
        op = rng.choice(choices)
        if op == "append":
            ids = fresh(rng.randint(1, 4))
            v = tbl.append(batch(ids))
            base = vis[published[-1]] if published else frozenset()
            vis[v] = base | ids
            ops[v] = "append"
            published.append(v)
        elif op == "overwrite":
            ids = fresh(rng.randint(1, 4))
            v = tbl.overwrite(batch(ids))
            vis[v] = ids
            ops[v] = "overwrite"
            published.append(v)
        elif op == "stage":
            wap_n += 1
            wap = f"w{wap_n}"
            ids = fresh(rng.randint(1, 4))
            v = tbl.stage_append(batch(ids), wap_id=wap)
            base = vis[published[-1]] if published else frozenset()
            vis[v] = base | ids
            ops[v] = "stage"
            staged[wap] = (v, ids)
        elif op == "publish":
            wap = rng.choice(sorted(staged))
            sv, own = staged.pop(wap)
            v = tbl.publish(wap)
            base = vis[published[-1]] if published else frozenset()
            vis[v] = base | own
            ops[v] = "publish"
            published.append(v)
        elif op == "rollback":
            to = rng.choice(published)
            v = tbl.rollback(to=to)
            vis[v] = vis[to]
            ops[v] = "rollback"
            published.append(v)
        elif op == "compact":
            v = tbl.compact(spark)
            vis[v] = vis[published[-1]]
            ops[v] = "replace"
            published.append(v)
        elif op == "evolve":
            # schema evolution mid-lifecycle: rows unchanged, appends
            # after it keep working (auto-projected), history records it
            from pyspark.sql import types as T

            evolve_n += 1
            v = tbl.add_column(f"tag{evolve_n}", T.StringType())
            vis[v] = vis[published[-1]]
            ops[v] = "evolve"
            published.append(v)
        elif op == "delete":
            k, r = rng.choice([(2, 0), (3, 1), (5, 2)])
            head = published[-1]
            matching = frozenset(i for i in vis[head] if i % k == r)
            v = tbl.delete_where(spark, f"rid % {k} = {r}")
            if matching:
                vis[v] = vis[head] - matching
                ops[v] = "delete"
                published.append(v)
            else:
                assert v == head  # no-op DELETE commits nothing
        elif op == "create_branch":
            branch_n += 1
            name = f"b{branch_n}"
            fork = published[-1]
            tbl.create_branch(name)
            branches[name] = {"head": fork, "fork": fork, "appends": []}
        elif op == "branch_append":
            name = rng.choice(sorted(branches))
            b = branches[name]
            ids = fresh(rng.randint(1, 4))
            v = tbl.append_to_branch(batch(ids), name)
            vis[v] = vis[b["head"]] | ids
            ops[v] = "branch-append"
            own_rows[v] = ids
            b["head"] = v
            b["appends"].append(v)
        elif op == "cherrypick":
            cands = [
                v
                for v in sorted(own_rows)
                if v in vis and v not in picked and v not in absorbed
            ]
            src = rng.choice(cands)
            v = tbl.cherrypick(src)
            vis[v] = vis[published[-1]] | own_rows[src]
            ops[v] = "cherry-pick"
            published.append(v)
            picked.add(src)
            # retry safety: re-picking the same source lands on the
            # SAME commit and adds no history
            assert tbl.cherrypick(src) == v
        elif op == "maintain":
            # the policy runner: forced compaction (replace) + keep_last
            # retention over PUBLISHED snapshots, honoring branch pins
            keep_n = rng.randint(1, 2)
            rep = tbl.maintain(
                spark,
                max_live_files=0,
                keep_last=keep_n,
                orphan_grace_sec=3600,
            )
            cv = rep["compacted_to"]
            assert cv is not None
            vis[cv] = vis[published[-1]]
            ops[cv] = "replace"
            published.append(cv)
            if len(published) > keep_n:
                trim_model(published[-keep_n])
        elif op == "fast_forward":
            from iceberg_insert_spark.sources.snapshots import (
                CommitConflict,
            )

            name = rng.choice(sorted(branches))
            b = branches[name]
            if b["head"] == b["fork"]:
                assert tbl.fast_forward(name) == published[-1]
            elif published[-1] != b["fork"]:
                with pytest.raises(CommitConflict):
                    tbl.fast_forward(name)
            else:
                v = tbl.fast_forward(name)
                vis[v] = vis[b["head"]]
                ops[v] = "fast_forward"
                published.append(v)
                # the branch's own commits are now main-ancestors: a
                # later cherry-pick of them must refuse (files already
                # on main) — keep them out of the pick candidate pool
                absorbed.update(b["appends"])
                b["head"] = b["fork"] = v
                b["appends"] = []
        elif op == "drop_branch":
            name = rng.choice(sorted(branches))
            tbl.drop_branch(name)
            del branches[name]
        else:  # expire
            keep = rng.choice(published[1:-1] or published)
            try:
                tbl.expire(keep_from=keep)
            except ValueError:
                continue  # would delete every snapshot — model skips too
            trim_model(keep)
        # invariants after every op
        assert tbl.history() == sorted(ops.items()), f"step {step} ({op})"
        if published:
            got = {
                r.rid for r in tbl.read(spark).collect()
            }
            assert got == set(vis[published[-1]]), f"step {step} ({op})"
        # eq-probe invariant (every 5th step, bounded cost): a bloom-
        # pruned point read must equal the model's membership answer
        # for both a visible rid and a provably-absent one
        if published and step % 5 == 4:
            cur = vis[published[-1]]
            probes = [next_id + 10**6]  # absent forever
            if cur:
                probes.append(rng.choice(sorted(cur)))
            for p in probes:
                hit = {
                    r.rid
                    for r in tbl.read(spark, eq=("rid", p)).collect()
                }
                want_hit = {p} if p in cur else set()
                assert hit == want_hit, f"step {step} eq-probe {p}"
    # final: every surviving snapshot matches the model
    for v in tbl.snapshots():
        got = {r.rid for r in tbl.read(spark, as_of=v).collect()}
        assert got == set(vis[v]), f"snapshot {v}"


def test_stats_pruning_date_and_nested_columns(spark, tmp_path):
    """Review-catch coverage: (a) date stats store as ISO strings and
    prune correctly with ISO bounds (lexicographic == chronological);
    (b) a nested column AHEAD of the stats column must not shift the
    footer column index (leaf lookup is by path_in_schema) — the bug
    shape was recording the wrong leaf's range and silently dropping
    rows; (c) binary-ish/unsupported stats types are skipped, not
    crashed on, and the commit survives."""
    o = load_table(spark, SF_DIR, "orders")
    # (a) timestamp column stats: stored as ISO strings, pruned with
    # ISO-string bounds (lexicographic == chronological; the fixture's
    # o_orderdate is a TIMESTAMP spanning 1995..2001)
    t1 = SnapshotTable(str(tmp_path / "d"), stats_cols=["o_orderdate"])
    t1.append(o.filter(F.col("o_orderdate") < "1998-01-01").coalesce(1))
    t1.append(o.filter(F.col("o_orderdate") >= "1998-01-01").coalesce(1))
    where = ("o_orderdate", "1999-06-01", "2002-12-31")
    kept, total = t1.plan_files(where=where)
    assert (len(kept), total) == (1, 2)
    want = o.filter(
        (F.col("o_orderdate") >= "1999-06-01")
        & (F.col("o_orderdate") <= "2002-12-31")
    ).count()
    assert want > 0
    assert t1.read(spark, where=where).count() == want
    # (b) nested struct BEFORE the stats column
    df = spark.sql(
        "SELECT named_struct('a', id * 10, 'b', id * 100) AS meta, "
        "id AS k FROM range(100)"
    )
    t2 = SnapshotTable(str(tmp_path / "n"), stats_cols=["k"])
    t2.append(df.filter("k < 50").coalesce(1))
    t2.append(df.filter("k >= 50").coalesce(1))
    # k-range [0, 49] lives only in file 1; the broken index space would
    # have recorded meta.b's range ([0, 4900]) for k and pruned nothing
    # (or, with other layouts, the wrong file)
    kept2, total2 = t2.plan_files(where=("k", 60, 70))
    assert (len(kept2), total2) == (1, 2)
    assert {r.k for r in t2.read(spark, where=("k", 60, 70)).collect()} == set(
        range(60, 71)
    )
    # (c) unsupported stats type (binary): commit fine, no stats entry
    dfb = spark.sql("SELECT CAST('ab' AS BINARY) AS raw, id AS k FROM range(5)")
    t3 = SnapshotTable(str(tmp_path / "b"), stats_cols=["raw"])
    t3.append(dfb.coalesce(1))
    assert t3.read(spark).count() == 5
    assert t3._load_stats() == {} or all(
        "raw" not in e for e in t3._load_stats().values()
    )


def test_optimistic_concurrency_claims_and_conflicts(spark, tmp_path):
    """Iceberg-style optimistic commits: (a) an orphaned _snap=N dir
    (a writer that crashed between the staging rename and its
    manifest) burns that version — the next commit skips it instead of
    colliding; (b) compact validates its base is still current inside
    the commit critical section and raises CommitConflict if a
    concurrent append landed mid-rewrite — the lost-update window a
    blind replace would hide; the failed attempt commits nothing and a
    re-run succeeds."""
    import os as _os

    from iceberg_insert_spark.sources.snapshots import CommitConflict

    o = load_table(spark, SF_DIR, "orders")
    tbl = SnapshotTable(str(tmp_path / "t"))
    tbl.append(o.filter(F.col("o_orderkey") % 3 == 0))
    # (a) crashed-writer debris: data dir for v2 exists, no manifest
    _os.makedirs(_os.path.join(tbl.path, "_snap=2"))
    v = tbl.append(o.filter(F.col("o_orderkey") % 3 == 1))
    assert v == 3  # v2 burned, not reused
    assert tbl.snapshots() == [1, 3]
    assert tbl.read(spark).count() == o.filter(
        F.col("o_orderkey") % 3 < 2
    ).count()

    # (b) compact vs concurrent append: patch read() to append midway,
    # reproducing a commit landing while the rewrite runs
    orig_read = SnapshotTable.read
    def racing_read(self, spark_, as_of=None, **kw):
        df = orig_read(self, spark_, as_of=as_of, **kw)
        # concurrent writer lands AFTER the rewrite planned its input
        tbl.append(o.filter(F.col("o_orderkey") % 3 == 2))
        return df
    SnapshotTable.read = racing_read
    try:
        with pytest.raises(CommitConflict, match="advanced past"):
            tbl.compact(spark)
    finally:
        SnapshotTable.read = orig_read
    # nothing replaced: the concurrent append's rows are all present
    assert tbl.read(spark).count() == o.count()
    # re-running compaction on the settled state succeeds
    v2 = tbl.compact(spark)
    assert tbl.history()[-1] == (v2, "replace")
    assert tbl.read(spark).count() == o.count()


def test_concurrent_appends_merge_not_lose(spark, tmp_path):
    """Four writers appending concurrently (shared session, one table):
    every append lands as its own snapshot with no interleaved files,
    and — the guarantee that matters — the FINAL visible state contains
    ALL rows. Version assignment + rebase + manifest swap happen inside
    the commit critical section, so a later commit's manifest always
    includes every earlier one: concurrent appends MERGE; the stale-base
    spelling (claim version early, build manifest lock-free) loses
    whichever append lands its manifest last."""
    from concurrent.futures import ThreadPoolExecutor

    o = load_table(spark, SF_DIR, "orders")
    tbl = SnapshotTable(str(tmp_path / "t"))

    def writer(r):
        return tbl.append(o.filter(F.col("o_orderkey") % 4 == r))

    with ThreadPoolExecutor(max_workers=4) as ex:
        versions = list(ex.map(writer, range(4)))
    assert sorted(versions) == [1, 2, 3, 4]
    # every snapshot's OWN files live in its own _snap dir (no mixing)
    import json as _json

    for v in tbl.snapshots():
        with open(os.path.join(tbl._mdir, f"v{v}.json")) as fh:
            meta = _json.load(fh)
        assert all(
            f.startswith(f"_snap={v}/") for f in meta["new_files"]
        )
    # no append lost: latest visibility is the union of all four
    assert tbl.read(spark).count() == o.count()
    assert {r.o_orderkey for r in tbl.read(spark).collect()} == {
        r.o_orderkey for r in o.collect()
    }


def test_token_index_fast_path_and_repair(spark, tmp_path):
    """append_once's dedup probe reads the token index (one JSON), not
    all manifests; a legacy table without the index gets it rebuilt by
    scan-once; expire trims entries for dropped snapshots and a
    re-sent expired token re-commits (the data is gone — replaying it
    is correct)."""
    import json as _json

    o = load_table(spark, SF_DIR, "orders")
    tbl = SnapshotTable(str(tmp_path / "t"))
    v1 = tbl.append_once(o.filter(F.col("o_orderkey") % 3 == 0), "b-0")
    v2 = tbl.append_once(o.filter(F.col("o_orderkey") % 3 == 1), "b-1")
    assert tbl._token_index() == {"b-0": v1, "b-1": v2}
    # replay: no-op through the index
    assert tbl.append_once(o.limit(5), "b-0") == v1
    assert tbl.snapshots() == [v1, v2]
    # legacy table: delete the index; the probe falls back to a
    # read-only manifest scan (no unlocked write — that could clobber
    # a concurrent commit's fresh entry), and the NEXT tokened commit
    # rebuilds the full index from inside the critical section
    os.remove(tbl._tokens_path())
    assert tbl.append_once(o.limit(5), "b-1") == v2
    assert not os.path.exists(tbl._tokens_path())
    v3 = tbl.append_once(o.limit(7), "b-2")
    assert _json.load(open(tbl._tokens_path())) == {
        "b-0": v1, "b-1": v2, "b-2": v3,
    }
    # expire drops v1/v2; their token entries are trimmed, and
    # re-sending an expired token commits fresh data instead of
    # pointing at nothing
    v_ow = tbl.overwrite(o.filter(F.col("o_orderkey") % 7 == 0))
    tbl.expire(keep_from=v_ow)
    assert "b-0" not in tbl._token_index()
    v5 = tbl.append_once(o.filter(F.col("o_orderkey") % 3 == 0), "b-0")
    assert v5 == v_ow + 1 and tbl._token_index()["b-0"] == v5


def test_concurrent_replayed_tokens_commit_exactly_once(spark, tmp_path):
    """Exactly-once under race: 8 workers all trying the SAME 4 batch
    tokens concurrently (the at-least-once replay storm a crashed
    stream driver produces). Every token must land exactly one
    snapshot — the advisory probe can pass in many workers at once,
    but the in-lock token decision admits one committer per token —
    and the final row count is the union of the 4 batches, nothing
    doubled."""
    from concurrent.futures import ThreadPoolExecutor

    o = load_table(spark, SF_DIR, "orders")
    tbl = SnapshotTable(str(tmp_path / "t"))
    batches = {f"b-{r}": o.filter(F.col("o_orderkey") % 4 == r)
               for r in range(4)}

    def replay(i):
        tok = f"b-{i % 4}"
        return tok, tbl.append_once(batches[tok], tok)

    with ThreadPoolExecutor(max_workers=8) as ex:
        results = list(ex.map(replay, range(8)))
    # each token maps to exactly ONE version, across all replays
    by_tok: dict = {}
    for tok, v in results:
        by_tok.setdefault(tok, set()).add(v)
    assert all(len(vs) == 1 for vs in by_tok.values()), by_tok
    assert len(tbl.snapshots()) == 4
    assert tbl.read(spark).count() == o.count()
    idx = tbl._token_index()
    assert sorted(idx) == ["b-0", "b-1", "b-2", "b-3"]


def test_compact_with_retry_replans_after_conflict(spark, tmp_path):
    """compact_with_retry re-plans against the advanced table after a
    CommitConflict: the first attempt races a concurrent append and
    aborts; the retry's rewrite INCLUDES the appended rows, so the
    compacted table is complete. Sustained pressure exhausts
    max_attempts and surfaces the conflict."""
    from iceberg_insert_spark.sources.snapshots import CommitConflict

    o = load_table(spark, SF_DIR, "orders")
    tbl = SnapshotTable(str(tmp_path / "t"))
    tbl.append(o.filter(F.col("o_orderkey") % 3 == 0).repartition(4))

    fired = {"n": 0}
    orig_read = SnapshotTable.read

    def racing_read(self, spark_, as_of=None, **kw):
        df = orig_read(self, spark_, as_of=as_of, **kw)
        if fired["n"] == 0:  # only the FIRST rewrite races an append
            fired["n"] += 1
            tbl.append(o.filter(F.col("o_orderkey") % 3 == 1))
        return df

    SnapshotTable.read = racing_read
    try:
        v = tbl.compact_with_retry(spark)
    finally:
        SnapshotTable.read = orig_read
    assert tbl.history()[-1] == (v, "replace")
    assert len(tbl._manifest(v)) == 1
    # the retry re-planned: the concurrent append's rows are IN the
    # compacted file, not dropped
    assert tbl.read(spark).count() == o.filter(
        F.col("o_orderkey") % 3 < 2
    ).count()

    # sustained pressure: every attempt races -> gives up loudly
    def always_racing_read(self, spark_, as_of=None, **kw):
        df = orig_read(self, spark_, as_of=as_of, **kw)
        tbl.append(o.limit(1))
        return df

    SnapshotTable.read = always_racing_read
    try:
        with pytest.raises(CommitConflict, match="optimistic races"):
            tbl.compact_with_retry(spark, max_attempts=2)
    finally:
        SnapshotTable.read = orig_read


def test_pruning_mixed_granularity_timestamp_bounds(spark, tmp_path):
    """Round-5 advice (medium): a date-only bound string sorts BELOW the
    same instant's datetime form ('1998-06-01' < '1998-06-01T00:00:00'),
    so lexicographic pruning dropped a file whose min timestamp is
    exactly midnight of the hi bound — rows the residual filter (which
    casts the date string to that midnight, inclusive <=) would match.
    plan_files now parses ISO-shaped strings to datetimes before the
    disjointness compare, so mixed granularities are chronological."""
    o = load_table(spark, SF_DIR, "orders")
    t = SnapshotTable(str(tmp_path / "g"), stats_cols=["o_orderdate"])
    t.append(o.filter(F.col("o_orderdate") < "1998-06-01").coalesce(1))
    t.append(o.filter(F.col("o_orderdate") >= "1998-06-01").coalesce(1))
    # hi bound is date-only; the second file's min stat is the full
    # datetime midnight form of the same day
    where = ("o_orderdate", "1995-01-01", "1998-06-01")
    want = o.filter(
        (F.col("o_orderdate") >= "1995-01-01")
        & (F.col("o_orderdate") <= "1998-06-01")
    ).count()
    boundary = o.filter(F.col("o_orderdate") == "1998-06-01").count()
    assert boundary > 0, "fixture must have rows exactly on the bound"
    kept, total = t.plan_files(where=where)
    assert total == 2 and len(kept) == 2  # second file NOT pruned
    assert t.read(spark, where=where).count() == want
    # the normalized compare still prunes what is truly disjoint
    kept2, _ = t.plan_files(where=("o_orderdate", "2005-01-01", "2009-01-01"))
    assert kept2 == []
    # unit corners: mixed granularity overlap kept; type mismatch kept;
    # plain ints still prune
    pd = SnapshotTable._provably_disjoint
    assert pd("1998-06-01T00:00:00", "1998-12-01T00:00:00",
              "1995-01-01", "1998-06-01") is False
    assert pd(1, 2, "a", "b") is False
    assert pd(1, 2, 5, 9) is True
    assert pd("2001-01-01", "2002-01-01",
              "1999-01-01", "2000-12-31T23:59:59") is True


def test_rollback_validates_inside_lock(spark, tmp_path):
    """Round-5 advice: rollback's existence/staged checks run inside the
    commit critical section, so a snapshot expired (or never committed)
    surfaces as the clean ValueError, never a raw FileNotFoundError."""
    o, tbl = _build(spark, tmp_path)
    with pytest.raises(ValueError, match="does not exist"):
        tbl.rollback(to=99)
    # simulate the expire race: the manifest vanishes before rollback
    os.remove(os.path.join(tbl._mdir, "v1.json"))
    with pytest.raises(ValueError, match="does not exist"):
        tbl.rollback(to=1)


def test_zero_file_snapshot_reads_as_typed_empty(spark, tmp_path):
    """Round-5 advice: an overwrite whose input wrote no part files
    leaves a zero-file manifest; read() must return a typed empty frame
    (schema recorded in the manifest at commit), not an opaque Spark
    error from a path-less parquet read."""
    o = load_table(spark, SF_DIR, "orders")
    tbl = SnapshotTable(str(tmp_path / "z"), stats_cols=["o_orderkey"])
    tbl.append(o)
    v = tbl.overwrite(o.filter(F.lit(False)).repartition(1))
    got = tbl.read(spark, as_of=v)
    assert got.count() == 0
    assert [f.name for f in got.schema.fields] == o.columns
    # pruned-read path over the same snapshot
    assert tbl.read(spark, as_of=v, where=("o_orderkey", 0, 10)).count() == 0
    # prior snapshot still reads fine
    assert tbl.read(spark, as_of=1).count() == o.count()


def test_commit_lock_heartbeat_protects_long_holder(spark, tmp_path):
    """Round-5 advice: a LIVE holder doing long in-lock work must not
    get its lock broken by a waiter's staleness probe — the heartbeat
    thread refreshes the lock mtime while held. With a 0.5 s stale
    threshold and a 2 s hold, a heartbeat-less implementation admits
    the waiter mid-hold (overlapping critical sections)."""
    import threading
    import time

    tbl = SnapshotTable(str(tmp_path / "hb"))
    tbl.COMMIT_LOCK_STALE_SEC = 0.5
    os.makedirs(tbl._mdir, exist_ok=True)
    events = []

    def holder():
        with tbl._commit_lock():
            events.append(("A-in", time.monotonic()))
            time.sleep(2.0)  # 4x the stale threshold
            events.append(("A-out", time.monotonic()))

    def waiter():
        time.sleep(0.2)
        with tbl._commit_lock():
            events.append(("B-in", time.monotonic()))
            events.append(("B-out", time.monotonic()))

    ts = [threading.Thread(target=holder), threading.Thread(target=waiter)]
    for t in ts:
        t.start()
    for t in ts:
        t.join(timeout=30)
    order = [e[0] for e in sorted(events, key=lambda e: e[1])]
    assert order == ["A-in", "A-out", "B-in", "B-out"]


def test_merge_applies_changelog_atomically(spark, tmp_path):
    """MERGE INTO as one snapshot: equality-delete keys + new row
    images commit together; reads are merge-on-read with the sequence
    rule (deletes apply only to OLDER data, so the merge's own
    re-inserts survive). Chained merges re-update rows a prior merge
    wrote; compaction folds the delete files away with identical rows;
    expire then reclaims the folded delete files."""
    df = spark.range(10).selectExpr("id AS k", "CAST(id * 10 AS DOUBLE) AS v")
    tbl = SnapshotTable(str(tmp_path / "m"))
    tbl.append(df)  # v1: k=0..9, v=10k

    def chg(rows):
        return spark.createDataFrame(rows, "k long, v double, _op string")

    # merge 1: delete k=0, update k=1 -> v=111, insert k=100
    v2 = tbl.merge(spark, chg([(0, 0.0, "D"), (1, 111.0, "U"),
                               (100, 1.0, "I")]), key="k")
    state2 = {r.k: r.v for r in tbl.read(spark).collect()}
    assert 0 not in state2 and state2[1] == 111.0 and state2[100] == 1.0
    assert len(state2) == 10  # 10 - 1 deleted + 1 inserted
    # merge 2 re-updates the row merge 1 wrote, and deletes the insert
    tbl.merge(spark, chg([(1, 222.0, "U"), (100, 0.0, "D")]), key="k")
    state3 = {r.k: r.v for r in tbl.read(spark).collect()}
    assert state3[1] == 222.0 and 100 not in state3
    assert len(state3) == 9
    # time travel: the merge-1 state is stable under later merges
    assert {r.k: r.v for r in tbl.read(spark, as_of=v2).collect()} == state2
    # history records the operation
    assert [op for _, op in tbl.history()] == ["append", "merge", "merge"]
    # incremental append scan across a merge must refuse, not lie
    from iceberg_insert_spark.sources.snapshots import _read_incremental
    with pytest.raises(ValueError, match="merge"):
        _read_incremental(tbl, spark, 1, 3)
    # compact folds deletes: rows identical, delete_files gone
    vc = tbl.compact(spark)
    assert {r.k: r.v for r in tbl.read(spark).collect()} == state3
    assert "delete_files" not in tbl._meta(vc)
    # expire reclaims the pre-compaction delete files
    del_files = [d["path"] for d in tbl._meta(vc - 1)["delete_files"]]
    assert all(os.path.exists(os.path.join(tbl.path, p)) for p in del_files)
    doomed = tbl.expire(keep_from=vc)
    assert set(del_files) <= set(doomed)
    assert not any(os.path.exists(os.path.join(tbl.path, p))
                   for p in del_files)
    assert {r.k: r.v for r in tbl.read(spark).collect()} == state3


def test_merge_rollback_carries_delete_files(spark, tmp_path):
    """Rolling back TO a merge snapshot must restore its merge-on-read
    view (delete files carried in the rollback manifest), and a pruned
    read over a merge snapshot still applies the deletes."""
    df = spark.range(100).selectExpr("id AS k", "CAST(id AS DOUBLE) AS v")
    tbl = SnapshotTable(str(tmp_path / "mr"), stats_cols=["k"])
    tbl.append(df.coalesce(1))
    chg = spark.createDataFrame(
        [(int(k), 0.0, "D") for k in range(0, 100, 10)],
        "k long, v double, _op string",
    )
    vm = tbl.merge(spark, chg, key="k")
    assert tbl.read(spark).count() == 90
    # pruned read: predicate range [0, 30] with deletes applied
    got = {r.k for r in tbl.read(spark, where=("k", 0, 30)).collect()}
    assert got == set(range(0, 31)) - {0, 10, 20, 30}
    tbl.overwrite(df.filter("k < 5"))
    assert tbl.read(spark).count() == 5
    tbl.rollback(to=vm)
    assert tbl.read(spark).count() == 90


def test_schema_evolution_is_snapshot_aware(spark, tmp_path):
    """Schema lives in the snapshot manifest: time travel to a
    pre-evolution snapshot returns THAT snapshot's schema; the latest
    read resolves old files onto the evolved schema (missing -> NULL,
    widened -> exact upcast); appends are auto-projected onto the
    current table schema; illegal promotions and unknown append
    columns are refused."""
    from pyspark.sql import types as T

    df1 = spark.range(5).selectExpr(
        "CAST(id AS INT) AS k", "CAST(id * 1.5 AS FLOAT) AS v"
    )
    tbl = SnapshotTable(str(tmp_path / "se"))
    v1 = tbl.append(df1)
    tbl.widen_column("k", T.LongType())
    tbl.widen_column("v", T.DoubleType())
    tbl.add_column("tag", T.StringType())
    df2 = spark.createDataFrame(
        [(10, 2.5, "new")], "k long, v double, tag string"
    )
    tbl.append(df2)
    # time travel: snapshot 1 keeps its own INT/FLOAT schema
    old = tbl.read(spark, as_of=v1)
    assert [(f.name, f.dataType.simpleString()) for f in old.schema.fields] \
        == [("k", "int"), ("v", "float")]
    # latest: evolved schema, old rows resolved (exact upcast + NULL tag)
    cur = tbl.read(spark)
    assert [(f.name, f.dataType.simpleString()) for f in cur.schema.fields] \
        == [("k", "bigint"), ("v", "double"), ("tag", "string")]
    rows = {r.k: (r.v, r.tag) for r in cur.collect()}
    assert rows[10] == (2.5, "new")
    assert rows[3] == (float(spark.sql(
        "SELECT CAST(CAST(3 * 1.5 AS FLOAT) AS DOUBLE)").first()[0]), None)
    assert len(rows) == 6
    # append with the PRE-widening frame still lands (auto-projection)
    tbl.append(spark.createDataFrame([(20, 1.0)], "k int, v float"))
    assert tbl.read(spark).count() == 7
    # guards
    with pytest.raises(ValueError, match="illegal promotion"):
        tbl.widen_column("tag", T.LongType())
    with pytest.raises(ValueError, match="already exists"):
        tbl.add_column("tag", T.StringType())
    with pytest.raises(ValueError, match="absent from the table schema"):
        tbl.append(spark.createDataFrame([(1, 1.0, "x", "y")],
                   "k long, v double, tag string, rogue string"))
    # history records the evolve commits
    assert [op for _, op in tbl.history()] == [
        "append", "evolve", "evolve", "evolve", "append", "append",
    ]


def test_schema_evolution_composes_with_merge_and_compact(spark, tmp_path):
    """Evolve + merge + compact interplay: a merge after an evolve
    anti-joins resolved old files; compaction folds both the deletes
    and the resolution into plainly-readable files with the evolved
    schema."""
    from pyspark.sql import types as T

    tbl = SnapshotTable(str(tmp_path / "sm"))
    tbl.append(spark.range(10).selectExpr("CAST(id AS INT) AS k"))
    tbl.widen_column("k", T.LongType())
    tbl.add_column("v", T.DoubleType())
    chg = spark.createDataFrame(
        [(0, 0.0, "D"), (1, 11.0, "U"), (50, 5.0, "I")],
        "k long, v double, _op string",
    )
    tbl.merge(spark, chg, key="k")
    state = {r.k: r.v for r in tbl.read(spark).collect()}
    assert 0 not in state and state[1] == 11.0 and state[50] == 5.0
    assert state[2] is None and len(state) == 10
    vc = tbl.compact(spark)
    assert {r.k: r.v for r in tbl.read(spark).collect()} == state
    meta = tbl._meta(vc)
    assert "delete_files" not in meta
    # compacted snapshot reads on the fast path (single scan group)
    assert meta["schema_v"] == vc


def test_remove_orphan_files_crash_injection(spark, tmp_path):
    """remove_orphan_files: debris from writers that crashed (a) before
    the commit rename (_staging-*), (b) between rename and manifest
    (_snap=N with no manifest), plus metadata temps and broken-lock
    leftovers, is detected and removed once older than the grace
    cutoff — while an in-flight commit's fresh staging dir inside the
    grace window and every manifest-referenced file survive, and the
    table reads identically afterwards."""
    import time

    o, tbl = _build(spark, tmp_path)
    before = tbl.read(spark).count()
    old = time.time() - 7200

    def age(path):
        os.utime(path, (old, old))
        for root, dirs, files in os.walk(path):
            for n in dirs + files:
                os.utime(os.path.join(root, n), (old, old))

    # (a) crashed pre-rename: old staging dir with a data file
    crashed = os.path.join(tbl.path, "_staging-crashed", "d")
    os.makedirs(crashed)
    open(os.path.join(crashed, "part-0.parquet"), "w").write("x")
    age(os.path.join(tbl.path, "_staging-crashed"))
    # (b) crashed post-rename: _snap dir that never got its manifest
    orphan_snap = os.path.join(tbl.path, "_snap=99")
    os.makedirs(orphan_snap)
    open(os.path.join(orphan_snap, "part-0.parquet"), "w").write("x")
    age(orphan_snap)
    # metadata debris
    open(os.path.join(tbl._mdir, "stats.json.tmp-123-456"), "w").write("{}")
    open(os.path.join(tbl._mdir, "commit.lock.stale-99-1"), "w").write("z")
    age(os.path.join(tbl._mdir, "stats.json.tmp-123-456"))
    age(os.path.join(tbl._mdir, "commit.lock.stale-99-1"))
    # an IN-FLIGHT commit: fresh staging dir inside the grace window
    live = os.path.join(tbl.path, "_staging-live", "d")
    os.makedirs(live)
    open(os.path.join(live, "part-0.parquet"), "w").write("y")
    # age every referenced data file too: old age alone must not doom
    for name in os.listdir(tbl.path):
        if name.startswith("_snap=") and name != "_snap=99":
            age(os.path.join(tbl.path, name))

    removed = tbl.remove_orphan_files(grace_sec=3600)
    assert "_staging-crashed" in removed
    assert "_snap=99" in removed
    assert any("stats.json.tmp-" in r for r in removed)
    assert any("commit.lock.stale-" in r for r in removed)
    assert not os.path.exists(orphan_snap)
    assert not os.path.exists(os.path.join(tbl.path, "_staging-crashed"))
    # survivors: the in-flight staging dir and all referenced data
    assert os.path.exists(live)
    assert tbl.read(spark).count() == before
    for v in tbl.snapshots():
        for p in tbl._all_paths(v):
            assert os.path.exists(os.path.join(tbl.path, p)), p
    # a second run finds nothing
    assert tbl.remove_orphan_files(grace_sec=3600) == []
    # grace=0 reclaims the now-"old" in-flight dir (operator's choice)
    removed2 = tbl.remove_orphan_files(grace_sec=-1)
    assert "_staging-live" in removed2


def test_sorted_compaction_improves_pruning(spark, tmp_path):
    """compact(sort_by=...) re-clusters data so the manifest [min,max]
    stats become disjoint: pre-compaction round-robin files prune
    NOTHING (kept == total), the sorted rewrite prunes the same range
    predicate to a strict subset, and the read stays row-identical."""
    o = load_table(spark, SF_DIR, "orders")
    tbl = SnapshotTable(str(tmp_path / "cs"), stats_cols=["o_orderkey"])
    for r in range(3):
        tbl.append(o.filter(F.col("o_orderkey") % 3 == r).repartition(2))
    mx = o.agg(F.max("o_orderkey")).collect()[0][0]
    where = ("o_orderkey", 5 * mx // 6 + 1, mx)
    kept0, total0 = tbl.plan_files(where=where)
    assert total0 == 6 and len(kept0) == 6  # random layout: no pruning
    want = {r.o_orderkey
            for r in tbl.read(spark, where=where, plan=kept0).collect()}
    tbl.compact(spark, target_files=3, sort_by=["o_orderkey"])
    kept1, total1 = tbl.plan_files(where=where)
    assert total1 == 3 and len(kept1) < 3  # disjoint ranges now prune
    got = {r.o_orderkey
           for r in tbl.read(spark, where=where, plan=kept1).collect()}
    assert got == want and want
    # unsorted compaction on the same inputs would NOT have pruned:
    tbl2 = SnapshotTable(str(tmp_path / "cu"), stats_cols=["o_orderkey"])
    for r in range(3):
        tbl2.append(o.filter(F.col("o_orderkey") % 3 == r).repartition(2))
    tbl2.compact(spark, target_files=3)
    kept2, total2 = tbl2.plan_files(where=where)
    assert total2 == 3 and len(kept2) == 3


def test_publish_after_merge_keeps_deletes(spark, tmp_path):
    """Review catch (shipped-bug grade): publish() must carry CURRENT
    main's delete_files into the published manifest — dropping them
    would resurrect merge-deleted rows the moment a WAP publish
    lands."""
    tbl = SnapshotTable(str(tmp_path / "pd"))
    tbl.append(spark.range(10).selectExpr("id AS k"))
    chg = spark.createDataFrame([(3, "D"), (7, "D")], "k long, _op string")
    tbl.merge(spark, chg, key="k")
    assert tbl.read(spark).count() == 8
    tbl.stage_append(spark.range(100, 103).selectExpr("id AS k"), "w1")
    tbl.publish("w1")
    got = {r.k for r in tbl.read(spark).collect()}
    assert got == (set(range(10)) - {3, 7}) | {100, 101, 102}


def test_publish_after_evolve_uses_current_schema(spark, tmp_path):
    """Review catch (shipped-bug grade): publish() must record CURRENT
    main's schema/schema_v, not the staged snapshot's — an evolve
    between stage and publish was silently reverted otherwise. The
    staged files (older than schema_v) resolve onto the evolved schema
    like any other pre-evolution files."""
    from pyspark.sql import types as T

    tbl = SnapshotTable(str(tmp_path / "pe"))
    tbl.append(spark.range(5).selectExpr("id AS k"))
    tbl.stage_append(spark.range(100, 102).selectExpr("id AS k"), "w1")
    tbl.add_column("tag", T.StringType())
    tbl.append(spark.createDataFrame([(200, "x")], "k long, tag string"))
    tbl.publish("w1")
    cur = tbl.read(spark)
    assert [f.name for f in cur.schema.fields] == ["k", "tag"]
    rows = {r.k: r.tag for r in cur.collect()}
    assert rows[200] == "x" and rows[100] is None and len(rows) == 8
    # the NEXT append still projects onto the evolved schema
    tbl.append(spark.range(300, 301).selectExpr("id AS k"))
    assert {r.k for r in tbl.read(spark).collect()} >= {300}


def test_incremental_guard_not_evaded_by_compaction(spark, tmp_path):
    """Review catch: the incremental append-scan guard is op-based — a
    compact after a merge folds the delete files away, but the range
    still contains non-append commits and must refuse (the set-diff
    delta would be the whole rewritten table)."""
    from iceberg_insert_spark.sources.snapshots import _read_incremental

    tbl = SnapshotTable(str(tmp_path / "ig"))
    tbl.append(spark.range(10).selectExpr("id AS k"))
    chg = spark.createDataFrame([(0, "D")], "k long, _op string")
    tbl.merge(spark, chg, key="k")
    tbl.compact(spark)
    with pytest.raises(ValueError, match="crosses a"):
        _read_incremental(tbl, spark, 1, 3)
    # a pure-append range after the compaction is fine again
    tbl.append(spark.range(50, 53).selectExpr("id AS k"))
    assert _read_incremental(tbl, spark, 3, 4).count() == 3


def test_merge_rejects_unknown_op_codes(spark, tmp_path):
    """Review catch: unknown changelog op codes (lowercase, words,
    NULL) must fail loudly instead of silently dropping rows."""
    tbl = SnapshotTable(str(tmp_path / "mo"))
    tbl.append(spark.range(5).selectExpr("id AS k"))
    for bad in ["d", "DELETE", None]:
        chg = spark.createDataFrame([(0, bad)], "k long, _op string")
        with pytest.raises(ValueError, match="expected 'I', 'U', or 'D'"):
            tbl.merge(spark, chg, key="k")
    assert tbl.read(spark).count() == 5  # nothing committed


def test_dynamic_partition_overwrite(spark, tmp_path):
    """overwrite_partitions replaces exactly the partitions present in
    the batch: untouched partitions keep their FILE IDENTITY (inherited
    by reference, no rewrite); the replaced partition's old files stay
    time-travelable until expire; manifest partition pruning plans
    single-partition reads without opening data; guards fire for
    unpartitioned tables and unknown partition columns."""
    df = spark.createDataFrame(
        [(i, ["a", "b", "c"][i % 3], float(i)) for i in range(30)],
        "k long, cat string, v double",
    )
    tbl = SnapshotTable(str(tmp_path / "dp"), partition_by=["cat"])
    v1 = tbl.append(df)
    m1 = tbl._meta(v1)
    assert {p["cat"] for p in m1["file_partitions"].values()} == {
        "a", "b", "c"
    }
    # reload partition 'b' with corrected values
    fixed = df.filter("cat = 'b'").withColumn("v", F.col("v") + 1000)
    v2 = tbl.overwrite_partitions(fixed)
    # untouched partitions: identical file lists (inherited by reference)
    def files_of(meta, val):
        return sorted(
            f for f, p in meta["file_partitions"].items()
            if p == {"cat": val}
        )
    m2 = tbl._meta(v2)
    for cat in ("a", "c"):
        assert files_of(m2, cat) == files_of(m1, cat)
    assert files_of(m2, "b") and files_of(m2, "b") != files_of(m1, "b")
    # data: only 'b' changed
    rows = {r.k: r.v for r in tbl.read(spark).collect()}
    for i in range(30):
        assert rows[i] == (float(i) + 1000 if i % 3 == 1 else float(i))
    # history op + time travel to the pre-reload state
    assert dict(tbl.history())[v2] == "dynamic_overwrite"
    old = {r.k: r.v for r in tbl.read(spark, as_of=v1).collect()}
    assert old[1] == 1.0
    # partition-pruned read: correct rows, strictly fewer files planned
    kept, total = tbl.plan_files(partitions={"cat": "a"})
    assert 0 < len(kept) < total
    got = {r.k for r in tbl.read(spark, partitions={"cat": "a"}).collect()}
    assert got == {i for i in range(30) if i % 3 == 0}
    # partitions + where compose
    narrow = tbl.read(spark, partitions={"cat": "a"}, where=("k", 0, 10))
    assert {r.k for r in narrow.collect()} == {0, 3, 6, 9}
    # expire past the reload reclaims ONLY the replaced 'b' files
    doomed = tbl.expire(keep_from=v2)
    assert set(doomed) == set(files_of(m1, "b"))
    assert {r.k: r.v for r in tbl.read(spark).collect()} == rows
    # guards
    with pytest.raises(ValueError, match="not a partition column"):
        tbl.plan_files(partitions={"nope": 1})
    plain = SnapshotTable(str(tmp_path / "plain"))
    plain.append(df)
    with pytest.raises(ValueError, match="partition_by"):
        plain.overwrite_partitions(df)


def test_partitioned_table_full_lifecycle(spark, tmp_path):
    """Partitioned snapshots compose with the rest of the lifecycle:
    appends accumulate per-partition files, rollback/evolve carry the
    partition metadata, compact folds a partitioned table, and the
    streaming source tails partitioned appends."""
    from pyspark.sql import types as T

    from iceberg_insert_spark.streaming.file_stream import (
        snapshot_stream_available_now,
    )

    def batch(lo, hi):
        return spark.createDataFrame(
            [(i, ["x", "y"][i % 2]) for i in range(lo, hi)],
            "k long, cat string",
        )

    tbl = SnapshotTable(str(tmp_path / "pl"), partition_by=["cat"])
    tbl.append(batch(0, 10))
    tbl.append(batch(10, 16))
    assert tbl.read(spark).count() == 16
    ve = tbl.add_column("tag", T.StringType())
    assert tbl._meta(ve)["partition_by"] == ["cat"]
    vr = tbl.rollback(to=1)
    assert tbl._meta(vr)["partition_by"] == ["cat"]
    assert tbl.read(spark).count() == 10
    vc = tbl.compact(spark)
    assert tbl.read(spark).count() == 10
    # compaction of a partitioned table keeps the partition mapping
    assert tbl._meta(vc).get("file_partitions")
    kept, total = tbl.plan_files(partitions={"cat": "x"})
    assert 0 < len(kept) < total
    # streaming source over partitioned appends
    seen = []
    ckpt = str(tmp_path / "ck.json")
    snapshot_stream_available_now(
        spark, tbl, ckpt, lambda b, v: seen.append((v, b.count())),
        skip_non_append=True,
    )
    assert [n for _, n in seen] == [10, 6]


def test_changelog_read_edge_cases(spark, tmp_path):
    """read_changelog corner semantics: an update is a delete+insert
    pair; a row appended AND deleted inside the range is suppressed on
    BOTH sides (no insert — its data seq < the delete's seq; no delete
    — it never existed at from_v); a pure-append range emits inserts
    only; non-append-shaped commits in range refuse."""
    from iceberg_insert_spark.sources.snapshots import read_changelog

    tbl = SnapshotTable(str(tmp_path / "cl"))
    tbl.append(spark.createDataFrame(
        [(i, float(i)) for i in range(5)], "k long, v double"))
    # v2 adds k=100; v3 merge deletes k=100 AND updates k=1
    tbl.append(spark.createDataFrame([(100, 1.0)], "k long, v double"))
    chg = spark.createDataFrame(
        [(100, 0.0, "D"), (1, 11.0, "U")], "k long, v double, _op string")
    tbl.merge(spark, chg, key="k")
    out = read_changelog(tbl, spark, 1, 3).collect()
    by = {}
    for r in out:
        by.setdefault(r._change_type, []).append((r.k, r.v))
    # k=100: add+delete inside range -> fully suppressed
    assert all(k != 100 for k, _ in by.get("insert", []))
    assert all(k != 100 for k, _ in by.get("delete", []))
    # update k=1: delete(old) + insert(new)
    assert (1, 1.0) in by["delete"] and (1, 11.0) in by["insert"]
    assert len(by["delete"]) == 1 and len(by["insert"]) == 1
    # pure-append range: inserts only
    out2 = read_changelog(tbl, spark, 1, 2).collect()
    assert [(r.k, r._change_type) for r in out2] == [(100, "insert")]
    # compact in range refuses
    tbl.compact(spark)
    with pytest.raises(ValueError, match="crosses a"):
        read_changelog(tbl, spark, 1, 4)


def test_changelog_refuses_pos_dv_delete_kinds_explicitly(spark, tmp_path):
    """Advisor catch (r7): read_changelog's old-image join assumes every
    in-range delete entry is an EQUALITY delete; pos/DV entries have no
    key column. Today that is guaranteed only because _validate_range
    refuses the 'delete' op — an implicit invariant a future DV-carrying
    allowed op would break with an opaque KeyError. Pin the explicit
    guard: doctor a DV delete commit's op to 'merge' (the shape such a
    future op would have) and assert the clean refusal."""
    import json
    import os

    from iceberg_insert_spark.sources.snapshots import read_changelog

    tbl = SnapshotTable(str(tmp_path / "cldv"))
    tbl.append(spark.createDataFrame(
        [(i, float(i)) for i in range(5)], "k long, v double"))
    v = tbl.delete_where(spark, "k = 2", strategy="mor")
    mpath = os.path.join(tbl._mdir, f"v{v}.json")
    with open(mpath) as fh:
        m = json.load(fh)
    assert m["op"] == "delete"
    m["op"] = "merge"  # simulate a future DV-carrying allowed op
    with open(mpath, "w") as fh:
        json.dump(m, fh)
    with pytest.raises(ValueError, match="cannot represent"):
        read_changelog(tbl, spark, 1, v)


def test_partition_value_encoding_booleans_and_nulls(spark, tmp_path):
    """Review catch: partition-value compares must use the hive-path
    encoding (Spark casts True -> 'true'; NULL lands in the hive
    default bucket) — Python str() forms never match and silently
    produced empty reads / duplicated dynamic overwrites."""
    df = spark.createDataFrame(
        [(1, True), (2, False), (3, None), (4, True)],
        "k long, flag boolean",
    )
    tbl = SnapshotTable(str(tmp_path / "pb"), partition_by=["flag"])
    tbl.append(df)
    # boolean filters return the right rows (not silently empty)
    assert {r.k for r in tbl.read(spark, partitions={"flag": True}).collect()} \
        == {1, 4}
    assert {r.k for r in tbl.read(spark, partitions={"flag": False}).collect()} \
        == {2}
    assert {r.k for r in tbl.read(spark, partitions={"flag": None}).collect()} \
        == {3}
    kept, total = tbl.plan_files(partitions={"flag": True})
    assert 0 < len(kept) < total
    # dynamic overwrite of the True partition replaces it exactly once
    tbl.overwrite_partitions(
        spark.createDataFrame([(10, True)], "k long, flag boolean")
    )
    got = {r.k for r in tbl.read(spark).collect()}
    assert got == {2, 3, 10}  # no duplicated old True rows


def test_partition_spec_mismatch_and_reserved_prefix(spark, tmp_path):
    """Review catches: a handle with a different partition_by must not
    commit (it would reinterpret the inherited tuples under the wrong
    columns), and user columns with the reserved __part_ prefix are
    refused instead of silently overwritten."""
    df = spark.createDataFrame([(1, "a", "b")], "k long, c1 string, c2 string")
    tbl = SnapshotTable(str(tmp_path / "ps"), partition_by=["c1"])
    tbl.append(df)
    wrong = SnapshotTable(str(tmp_path / "ps"), partition_by=["c2"])
    with pytest.raises(ValueError, match="partitioned by"):
        wrong.append(df)
    none = SnapshotTable(str(tmp_path / "ps"))
    with pytest.raises(ValueError, match="partitioned by"):
        none.append(df)
    bad = spark.createDataFrame([(1, "a", "x")],
                                "k long, c1 string, __part_c1 string")
    t2 = SnapshotTable(str(tmp_path / "rp"), partition_by=["c1"])
    with pytest.raises(ValueError, match="reserved '__part_'"):
        t2.append(bad)


def test_cdc_readers_reject_swapped_bounds(spark, tmp_path):
    """Review catch: swapped/equal bounds silently read as 'no changes'
    — both CDC readers must refuse instead."""
    from iceberg_insert_spark.sources.snapshots import (
        _read_incremental,
        read_changelog,
    )

    tbl = SnapshotTable(str(tmp_path / "sb"))
    tbl.append(spark.range(3).selectExpr("id AS k"))
    tbl.append(spark.range(3, 6).selectExpr("id AS k"))
    for fn in (_read_incremental, read_changelog):
        with pytest.raises(ValueError, match="from_v < to_v"):
            fn(tbl, spark, 2, 1)
        with pytest.raises(ValueError, match="from_v < to_v"):
            fn(tbl, spark, 2, 2)


def test_concurrent_merges_compose(spark, tmp_path):
    """Four writers merging concurrently (disjoint key slices of one
    changelog, shared session): every merge lands as its own snapshot,
    the rebase inside the commit critical section makes each manifest
    include every earlier merge's data AND delete files, and the final
    merge-on-read state equals applying all four changelogs — no lost
    deletes, no lost upserts, no resurrected rows."""
    from concurrent.futures import ThreadPoolExecutor

    base = spark.range(100).selectExpr("id AS k", "CAST(id AS DOUBLE) AS v")
    tbl = SnapshotTable(str(tmp_path / "cm"))
    tbl.append(base)

    def changelog(r):
        # slice r: delete keys k%4==r with k<40, update keys k%4==r
        # with 40<=k<80 to v+1000, insert key 1000+r
        rows = (
            [(k, 0.0, "D") for k in range(r, 40, 4)]
            + [(k, float(k) + 1000, "U") for k in range(40 + r, 80, 4)]
            + [(1000 + r, float(r), "I")]
        )
        return spark.createDataFrame(rows, "k long, v double, _op string")

    def writer(r):
        return tbl.merge(spark, changelog(r), key="k")

    with ThreadPoolExecutor(max_workers=4) as ex:
        versions = list(ex.map(writer, range(4)))
    assert sorted(versions) == [2, 3, 4, 5]
    got = {r.k: r.v for r in tbl.read(spark).collect()}
    want = {k: float(k) for k in range(100) if k >= 40}
    for k in range(40, 80):
        want[k] = float(k) + 1000
    for r in range(4):
        want[1000 + r] = float(r)
    assert got == want
    # every merge snapshot carries ALL earlier delete files (rebase)
    for i, v in enumerate(sorted(versions)):
        assert len(tbl._meta(v).get("delete_files", [])) >= i + 1
    # compaction folds the whole pile; rows unchanged
    tbl.compact(spark)
    assert {r.k: r.v for r in tbl.read(spark).collect()} == want


def test_zorder_compaction_prunes_both_dimensions(spark, tmp_path):
    """compact_zorder clusters on BOTH dimensions: after z-compacting a
    round-robin-laid table with stats on two independent columns, range
    predicates on EITHER column prune files (a linear sort would only
    serve its leading column), and the rows are identical."""
    o = load_table(spark, SF_DIR, "orders")
    tbl = SnapshotTable(
        str(tmp_path / "zc"), stats_cols=["o_custkey", "o_orderkey"]
    )
    tbl.append(o.repartition(8))  # 8 files, each spanning both ranges
    mx_k = o.agg(F.max("o_orderkey")).collect()[0][0]
    mx_c = o.agg(F.max("o_custkey")).collect()[0][0]
    where_k = ("o_orderkey", 1, mx_k // 8)
    where_c = ("o_custkey", 1, mx_c // 8)
    kept_k0, tot0 = tbl.plan_files(where=where_k)
    kept_c0, _ = tbl.plan_files(where=where_c)
    assert len(kept_k0) == tot0 == 8 and len(kept_c0) == 8  # no pruning
    want_k = tbl.read(spark, where=where_k).count()
    want_c = tbl.read(spark, where=where_c).count()
    tbl.compact_zorder(spark, "o_custkey", "o_orderkey", target_files=8)
    kept_k1, tot1 = tbl.plan_files(where=where_k)
    kept_c1, _ = tbl.plan_files(where=where_c)
    assert tot1 == 8
    assert len(kept_k1) < 8 and len(kept_c1) < 8  # BOTH dims prune
    assert tbl.read(spark, where=where_k, plan=kept_k1).count() == want_k
    assert tbl.read(spark, where=where_c, plan=kept_c1).count() == want_c


def test_partition_spec_evolution(spark, tmp_path):
    """Iceberg partition evolution: changing the spec is metadata-only —
    old files keep their own per-file record and are conservatively
    kept (+ residually filtered) by pruning on either the old or the
    new column; new appends lay out under the new spec and prune on
    it; dynamic overwrite refuses while pre-evolution files remain and
    works again after a compact rewrites them under the current spec."""
    df = spark.createDataFrame(
        [(i, ["a", "b"][i % 2], ["x", "y", "z"][i % 3]) for i in range(30)],
        "k long, cat string, region string",
    )
    tbl = SnapshotTable(str(tmp_path / "pse"), partition_by=["cat"])
    tbl.append(df.filter("k < 12"))
    tbl.evolve_partitioning(["region"])
    tbl.append(df.filter("k >= 12"))
    assert tbl.read(spark).count() == 30
    # prune on the NEW column: old-spec files conservatively kept,
    # new-spec non-matching files pruned, result exact via residual
    kept, total = tbl.plan_files(partitions={"region": "x"})
    assert len(kept) < total
    got = {r.k for r in tbl.read(spark, partitions={"region": "x"}).collect()}
    assert got == {i for i in range(30) if i % 3 == 0}
    # prune on the OLD column still answers correctly
    got2 = {r.k for r in tbl.read(spark, partitions={"cat": "a"}).collect()}
    assert got2 == {i for i in range(30) if i % 2 == 0}
    # history records the spec change; stale handles refuse
    assert "evolve_spec" in [op for _, op in tbl.history()]
    stale = SnapshotTable(str(tmp_path / "pse"), partition_by=["cat"])
    with pytest.raises(ValueError, match="partitioned by"):
        stale.append(df.filter("k < 2"))
    # dynamic overwrite refuses across mixed specs...
    with pytest.raises(ValueError, match="compact"):
        tbl.overwrite_partitions(
            df.filter("region = 'x'").withColumn("k", F.col("k") + 100)
        )
    # ...and works after compaction rewrites under the current spec
    tbl.compact(spark, target_files=3)
    tbl.overwrite_partitions(
        df.filter("region = 'x'").select(
            (F.col("k") + 100).alias("k"), "cat", "region"
        )
    )
    got3 = {r.k for r in tbl.read(spark).collect()}
    want = {i for i in range(30) if i % 3 != 0} | {
        i + 100 for i in range(30) if i % 3 == 0
    }
    assert got3 == want


def test_stale_handle_cannot_revert_spec_via_replace(spark, tmp_path):
    """Review catch: replace-type commits (compact/overwrite) from a
    handle opened with the OLD spec must refuse after a partition-spec
    evolution — a silent replace would revert the evolution wholesale."""
    df = spark.createDataFrame(
        [(1, "a", "x"), (2, "b", "y")], "k long, cat string, region string"
    )
    tbl = SnapshotTable(str(tmp_path / "sr"), partition_by=["cat"])
    tbl.append(df)
    stale = SnapshotTable(str(tmp_path / "sr"), partition_by=["cat"])
    tbl.evolve_partitioning(["region"])
    with pytest.raises(ValueError, match="partitioned by"):
        stale.compact(spark)
    with pytest.raises(ValueError, match="partitioned by"):
        stale.overwrite(df)
    # the evolved handle compacts fine
    tbl.compact(spark)
    assert tbl.read(spark).count() == 2
    # files_info validates the snapshot exists
    with pytest.raises(ValueError, match="does not exist"):
        tbl.files_info(as_of=99)


def test_cdc_lifecycle_model_randomized(spark, tmp_path):
    """Model-based check of the CDC surface: a seeded random sequence
    of append / merge (delete+update+insert) / compact / rollback /
    expire runs against both the real SnapshotTable and a pure-Python
    {rid: value} model. After every operation the latest merge-on-read
    state must equal the model exactly (keys AND values — updates are
    value changes, so a lost delete file, a seq-visibility slip, or a
    resurrected row all surface); at the end every surviving snapshot
    matches. Complements test_lifecycle_model_randomized, which models
    visibility sets over the append/WAP surface."""
    import random

    rng = random.Random(20260814)
    tbl = SnapshotTable(str(tmp_path / "cdc"))
    vis: dict[int, dict[int, float]] = {}
    published: list[int] = []
    next_id = 0

    def df_of(mapping):
        return spark.createDataFrame(
            [(k, v) for k, v in sorted(mapping.items())],
            "rid long, val double",
        ).coalesce(1)

    def fresh(n):
        nonlocal next_id
        ids = list(range(next_id, next_id + n))
        next_id += n
        return ids

    # seed state
    ids = fresh(6)
    v = tbl.append(df_of({i: float(i) for i in ids}))
    vis[v] = {i: float(i) for i in ids}
    published.append(v)

    for step in range(22):
        cur = vis[published[-1]]
        choices = ["append", "merge", "compact", "delete_where",
                   "update_where", "delete_mor"]
        if len(published) >= 2:
            choices += ["rollback", "expire"]
        op = rng.choice(choices)
        if op == "append":
            ids = fresh(rng.randint(1, 3))
            batch = {i: float(i) for i in ids}
            v = tbl.append(df_of(batch))
            vis[v] = {**cur, **batch}
            published.append(v)
        elif op == "merge":
            keys = sorted(cur)
            dels = rng.sample(keys, min(len(keys), rng.randint(0, 2)))
            upds = rng.sample(
                [k for k in keys if k not in dels],
                min(len(keys) - len(dels), rng.randint(0, 2)),
            )
            ins = fresh(rng.randint(0, 2))
            rows = (
                [(k, 0.0, "D") for k in dels]
                + [(k, cur[k] + 100.0, "U") for k in upds]
                + [(k, float(k), "I") for k in ins]
            )
            if not rows:
                continue
            chg = spark.createDataFrame(
                rows, "rid long, val double, _op string"
            )
            v = tbl.merge(spark, chg, key="rid")
            state = {k: x for k, x in cur.items() if k not in dels}
            for k in upds:
                state[k] = cur[k] + 100.0
            for k in ins:
                state[k] = float(k)
            vis[v] = state
            published.append(v)
        elif op == "compact":
            v = tbl.compact(spark)
            vis[v] = dict(cur)
            published.append(v)
        elif op == "delete_where":
            # CoW delete over whatever state exists — including live
            # equality deletes from earlier merges (the planning scan
            # must be MoR-aware) and post-rollback states
            k, r = rng.choice([(2, 0), (3, 1), (5, 2)])
            matching = {i for i in cur if i % k == r}
            v = tbl.delete_where(spark, f"rid % {k} = {r}")
            if matching:
                vis[v] = {i: x for i, x in cur.items() if i not in matching}
                published.append(v)
            else:
                assert v == published[-1]  # no-op commits nothing
        elif op == "delete_mor":
            # positional-delete variant: same visibility semantics as
            # the CoW delete, zero data files rewritten — the model
            # can't tell them apart, which is exactly the contract
            k, r = rng.choice([(2, 1), (3, 2), (4, 0)])
            matching = {i for i in cur if i % k == r}
            v = tbl.delete_where(
                spark, f"rid % {k} = {r}", strategy="mor"
            )
            if matching:
                vis[v] = {
                    i: x for i, x in cur.items() if i not in matching
                }
                published.append(v)
            else:
                assert v == published[-1]
        elif op == "update_where":
            k, r = rng.choice([(2, 1), (3, 0), (4, 2)])
            strat = rng.choice(["cow", "mor"])
            matching = {i for i in cur if i % k == r}
            v = tbl.update_where(
                spark,
                f"rid % {k} = {r}",
                {"val": "val + 1000.0"},
                strategy=strat,
            )
            if matching:
                vis[v] = {
                    i: (x + 1000.0 if i in matching else x)
                    for i, x in cur.items()
                }
                published.append(v)
            else:
                assert v == published[-1]
        elif op == "rollback":
            to = rng.choice(published)
            v = tbl.rollback(to=to)
            vis[v] = dict(vis[to])
            published.append(v)
        else:  # expire
            keep = rng.choice(published[1:-1] or published)
            try:
                tbl.expire(keep_from=keep)
            except ValueError:
                continue
            for w in [w for w in vis if w < keep]:
                del vis[w]
            published = [w for w in published if w >= keep]
        got = {r.rid: r.val for r in tbl.read(spark).collect()}
        assert got == vis[published[-1]], f"step {step} ({op})"
    for v in tbl.snapshots():
        got = {r.rid: r.val for r in tbl.read(spark, as_of=v).collect()}
        assert got == vis[v], f"snapshot {v}"


def test_timestamp_as_of_reads_and_expiry(spark, tmp_path):
    """TIMESTAMP AS OF: every commit records its wall-clock in the
    manifest; read(as_of_ts=t) resolves the newest published snapshot
    committed at or before t (staged snapshots invisible), errors
    before the first commit, and expire_older_than drops by timestamp
    while always keeping the latest state."""
    import time

    o = load_table(spark, SF_DIR, "orders")
    tbl = SnapshotTable(str(tmp_path / "ts"))
    vs, stamps = [], []
    for r in range(3):
        vs.append(tbl.append(o.filter(F.col("o_orderkey") % 3 == r)))
        stamps.append(tbl._meta(vs[-1])["ts"])
        time.sleep(0.02)
    # between commit 1 and 2 -> snapshot 1; at/after the last -> latest
    mid = (stamps[0] + stamps[1]) / 2
    assert tbl.resolve_as_of_ts(mid) == vs[0]
    assert tbl.resolve_as_of_ts(stamps[1]) == vs[1]
    n0 = o.filter(F.col("o_orderkey") % 3 == 0).count()
    assert tbl.read(spark, as_of_ts=mid).count() == n0
    assert tbl.read(spark, as_of_ts=time.time()).count() == o.count()
    with pytest.raises(ValueError, match="no snapshot at or before"):
        tbl.resolve_as_of_ts(stamps[0] - 1000)
    with pytest.raises(ValueError, match="not both"):
        tbl.read(spark, as_of=1, as_of_ts=mid)
    # staged snapshots never resolve from timestamps
    sv = tbl.stage_append(o.limit(5), wap_id="wts")
    assert tbl.resolve_as_of_ts(time.time()) == vs[-1] != sv
    # timestamp-based expiry keeps the latest even with a future cutoff
    doomed = tbl.expire_older_than(stamps[2])
    assert tbl.resolve_as_of_ts(time.time()) == vs[-1]
    assert vs[0] not in tbl.snapshots()
    del doomed


def test_tags_pin_snapshots_through_expiry(spark, tmp_path):
    """Iceberg TAGS: a named immutable ref retains its snapshot (and
    files, and exactly-once token) through expire regardless of the
    age cutoff — the reproducible-training-corpus pin; untag releases
    it and the next expire reclaims."""
    o = load_table(spark, SF_DIR, "orders")
    tbl = SnapshotTable(str(tmp_path / "tg"))
    v1 = tbl.append_once(o.filter(F.col("o_orderkey") % 3 == 0),
                         token="b-0")
    tbl.overwrite(o.filter(F.col("o_orderkey") % 3 == 1))
    tbl.overwrite(o.filter(F.col("o_orderkey") % 3 == 2))
    tbl.tag("corpus-v1", v1)
    assert tbl.tags() == {"corpus-v1": v1}
    n1 = o.filter(F.col("o_orderkey") % 3 == 0).count()
    # expire everything below the latest: the tagged snapshot survives
    tbl.expire(keep_from=3)
    assert v1 in tbl.snapshots() and 2 not in tbl.snapshots()
    assert tbl.read_tag(spark, "corpus-v1").count() == n1
    # its exactly-once token survived the trim too
    assert tbl.append_once(o.limit(1), token="b-0") == v1
    # guards
    with pytest.raises(ValueError, match="already exists"):
        tbl.tag("corpus-v1")
    with pytest.raises(ValueError, match="does not exist"):
        tbl.tag("nope", 99)
    with pytest.raises(ValueError, match="no such tag"):
        tbl.read_tag(spark, "ghost")
    # untag -> reclaimable
    tbl.untag("corpus-v1")
    tbl.expire(keep_from=3)
    assert v1 not in tbl.snapshots()
    with pytest.raises(ValueError, match="no such tag"):
        tbl.untag("corpus-v1")


def test_verify_fsck_reports_each_inconsistency(spark, tmp_path):
    """verify() is the admin fsck: healthy tables report all-empty;
    each injected inconsistency (externally deleted data file, token
    to an expired snapshot, tag to a removed manifest, stats entry for
    an unreferenced file) lands in exactly its own bucket."""
    import json as _json

    o = load_table(spark, SF_DIR, "orders")
    tbl = SnapshotTable(str(tmp_path / "fs"), stats_cols=["o_orderkey"])
    tbl.append_once(o.filter(F.col("o_orderkey") % 2 == 0), token="t1")
    tbl.append(o.filter(F.col("o_orderkey") % 2 == 1))
    assert tbl.verify() == {
        "missing_files": [], "missing_manifests": [],
        "dangling_tokens": [],
        "dangling_refs": [], "orphan_stats": [],
        "orphan_blooms": [], "orphan_ndv": [],
    }
    # inject: delete a live data file externally
    victim = tbl._manifest(2)[0]
    os.remove(os.path.join(tbl.path, victim))
    # inject: token to a nonexistent snapshot (97, not 99 — the
    # missing-manifest injection below makes v99 a real snapshot)
    idx = tbl._token_index(); idx["ghost"] = 97
    tbl._atomic_json(tbl._tokens_path(), idx)
    # inject: ref to a removed snapshot
    tbl._atomic_json(tbl._refs_path(), {"old": 98})
    # inject: stats entry for an unreferenced file
    st = tbl._load_stats(); st["_snap=9/ghost.parquet"] = {"::rows": 1}
    tbl._atomic_json(tbl._stats_path(), st)
    # inject: bloom entry for an unreferenced file
    tbl._atomic_json(
        tbl._bloom_sidecar_path(),
        {"_snap=8/ghost.parquet": {"o_orderkey": {"m": 256, "k": 4}}},
    )
    # inject: a manifest LIST referencing a manifest file that never
    # landed (partial-backup restore) — fsck must REPORT it, not crash
    # with FileNotFoundError (advisor-grade review catch, r8); a
    # doctored separate snapshot, so no other bucket cascades
    tbl._atomic_json(
        os.path.join(tbl._mdir, "v99.json"),
        {"op": "append", "new_files": [],
         "manifest_list": [{"path": "m-99-0.json", "n": 1}]},
    )
    rep = tbl.verify()
    assert rep["missing_files"] == [victim]
    assert rep["missing_manifests"] == ["m-99-0.json"]
    assert rep["dangling_tokens"] == ["ghost"]
    assert rep["dangling_refs"] == ["old"]
    assert rep["orphan_stats"] == ["_snap=9/ghost.parquet"]
    assert rep["orphan_blooms"] == ["_snap=8/ghost.parquet"]
    del _json


def test_merge_composes_with_partitioned_tables(spark, tmp_path):
    """CDC merge on a PARTITIONED snapshot table: upsert row images lay
    out under the partition spec, the equality-delete file stays
    spec-agnostic (keys only), merge-on-read applies deletes under
    partition-pruned reads, and dynamic overwrite afterwards refuses
    (a replaced partition could hide rows a delete still targets is
    fine — deletes are by key — but the merge's files ARE current-spec
    so it works) — pin the actual composed behavior."""
    df = spark.createDataFrame(
        [(i, ["a", "b"][i % 2], float(i)) for i in range(20)],
        "k long, cat string, v double",
    )
    tbl = SnapshotTable(str(tmp_path / "pm"), partition_by=["cat"])
    tbl.append(df)
    chg = spark.createDataFrame(
        [(0, "a", 0.0, "D"), (2, "a", 222.0, "U"), (100, "b", 1.0, "I")],
        "k long, cat string, v double, _op string",
    )
    tbl.merge(spark, chg, key="k")
    rows = {r.k: r.v for r in tbl.read(spark).collect()}
    assert 0 not in rows and rows[2] == 222.0 and rows[100] == 1.0
    assert len(rows) == 20
    # the merge's own files carry partition records (current spec)
    vm = max(tbl.snapshots())
    m = tbl._meta(vm)
    for f in m["new_files"]:
        assert m["file_partitions"][f].get("cat") in ("a", "b")
    # partition-pruned read still applies the deletes
    a_rows = {r.k for r in tbl.read(spark, partitions={"cat": "a"}).collect()}
    assert a_rows == {i for i in range(20) if i % 2 == 0} - {0} | set()
    assert 2 in a_rows
    b_rows = {r.k for r in tbl.read(spark, partitions={"cat": "b"}).collect()}
    assert b_rows == {i for i in range(20) if i % 2 == 1} | {100}
    # dynamic overwrite over a table with live delete files: replaces
    # partition 'b' wholesale; the delete file still applies to the
    # surviving older 'a' files
    tbl.overwrite_partitions(
        spark.createDataFrame([(500, "b", 5.0)], "k long, cat string, v double")
    )
    rows2 = {r.k: r.v for r in tbl.read(spark).collect()}
    assert rows2 == {
        **{i: (222.0 if i == 2 else float(i))
           for i in range(20) if i % 2 == 0 and i != 0},
        500: 5.0,
    }


def test_branch_lifecycle_isolation_and_fast_forward(spark, tmp_path):
    """Branch commits are invisible to main (read, latest-published,
    TIMESTAMP AS OF), readable at the branch head, and fast_forward
    merges them back as ONE metadata-only main commit; afterwards the
    branch is reset even with main and can keep committing."""
    o = load_table(spark, SF_DIR, "orders")
    tbl = SnapshotTable(str(tmp_path / "t"))
    tbl.append(o.filter(F.col("o_orderkey") % 4 == 0))
    n0 = tbl.read(spark).count()
    tbl.create_branch("b")
    tbl.append_to_branch(o.filter(F.col("o_orderkey") % 4 == 1), "b")
    tbl.append_to_branch(o.filter(F.col("o_orderkey") % 4 == 2), "b")
    n1 = o.filter(F.col("o_orderkey") % 4 == 1).count()
    n2 = o.filter(F.col("o_orderkey") % 4 == 2).count()
    # isolation: main is untouched while the branch holds 2 commits
    assert tbl.read(spark).count() == n0
    assert tbl._latest_published() == 1
    assert tbl.read_branch(spark, "b").count() == n0 + n1 + n2
    assert [op for _, op in tbl.history()] == [
        "append", "branch-append", "branch-append",
    ]
    # fast-forward: one metadata commit, main == branch head
    v = tbl.fast_forward("b")
    assert tbl.read(spark).count() == n0 + n1 + n2
    assert dict(tbl.history())[v] == "fast_forward"
    # branch reset even with main: immediate re-ff is a no-op
    assert tbl.fast_forward("b") == v
    # and the branch keeps working for the next round
    tbl.append_to_branch(o.filter(F.col("o_orderkey") % 4 == 3), "b")
    assert tbl.read(spark).count() == n0 + n1 + n2
    v2 = tbl.fast_forward("b")
    assert v2 > v and tbl.read(spark).count() == o.count()


def test_branch_divergence_refused(spark, tmp_path):
    """A main commit landing after the fork makes fast_forward a
    CommitConflict — never a silent replay onto moved main."""
    from iceberg_insert_spark.sources.snapshots import CommitConflict

    o = load_table(spark, SF_DIR, "orders")
    tbl = SnapshotTable(str(tmp_path / "t"))
    tbl.append(o.filter(F.col("o_orderkey") % 4 == 0))
    tbl.create_branch("b")
    tbl.append_to_branch(o.filter(F.col("o_orderkey") % 4 == 1), "b")
    tbl.append(o.filter(F.col("o_orderkey") % 4 == 2))  # main moves
    with pytest.raises(CommitConflict, match="fork point"):
        tbl.fast_forward("b")


def test_branch_ref_surface_guards(spark, tmp_path):
    """Tags and branches share the ref namespace but not the verbs;
    rollback refuses off-main targets; drop_branch releases retention."""
    o = load_table(spark, SF_DIR, "orders")
    tbl = SnapshotTable(str(tmp_path / "t"))
    tbl.append(o.filter(F.col("o_orderkey") % 4 == 0))
    tbl.create_branch("b")
    bv = tbl.append_to_branch(o.filter(F.col("o_orderkey") % 4 == 1), "b")
    with pytest.raises(ValueError, match="already exists"):
        tbl.tag("b")
    with pytest.raises(ValueError, match="already exists"):
        tbl.create_branch("b")
    with pytest.raises(ValueError, match="use drop_branch"):
        tbl.untag("b")
    with pytest.raises(ValueError, match="no such branch"):
        tbl.drop_branch("nope")
    with pytest.raises(ValueError, match="branch commit"):
        tbl.rollback(bv)
    assert tbl.branches() == {
        "b": {"type": "branch", "snapshot": bv, "forked_from": 1}
    }
    assert tbl.tags() == {}
    # expire keeps the branch HEAD even past the cutoff...
    tbl.append(o.filter(F.col("o_orderkey") % 4 == 2))
    tbl.expire(keep_from=3)
    assert bv in tbl.snapshots()
    assert tbl.read_branch(spark, "b").count() > 0
    assert tbl.verify()["dangling_refs"] == []
    # ...and drop_branch releases it for the next expire
    tbl.drop_branch("b")
    tbl.expire(keep_from=3)
    assert bv not in tbl.snapshots()


def test_branch_invisible_to_streaming_until_fast_forward(spark, tmp_path):
    """The snapshot streaming source skips branch commits, then
    delivers the fast_forward as one batch of exactly the
    branch-added files."""
    from iceberg_insert_spark.streaming.file_stream import (
        snapshot_stream_available_now,
    )

    o = load_table(spark, SF_DIR, "orders")
    tbl = SnapshotTable(str(tmp_path / "t"))
    tbl.append(o.filter(F.col("o_orderkey") % 4 == 0))
    tbl.create_branch("b")
    tbl.append_to_branch(o.filter(F.col("o_orderkey") % 4 == 1), "b")
    ckpt = str(tmp_path / "ckpt.json")
    seen: list[tuple[int, int]] = []
    snapshot_stream_available_now(
        spark, tbl, ckpt, lambda df, v: seen.append((v, df.count()))
    )
    assert [v for v, _ in seen] == [1]  # branch commit not delivered
    ffv = tbl.fast_forward("b")
    snapshot_stream_available_now(
        spark, tbl, ckpt, lambda df, v: seen.append((v, df.count()))
    )
    n1 = o.filter(F.col("o_orderkey") % 4 == 1).count()
    assert seen[1] == (ffv, n1)  # exactly the branch-added rows


def test_branch_schema_follows_branch_head(spark, tmp_path):
    """Branch appends project onto the BRANCH head's schema (their
    inherit base), independent of main's."""
    tbl = SnapshotTable(str(tmp_path / "t"))
    tbl.append(spark.createDataFrame([(1, "a")], "k long, s string"))
    tbl.create_branch("b")
    tbl.append_to_branch(spark.createDataFrame([(2,)], "k long"), "b")
    head = tbl.read_branch(spark, "b")
    assert head.count() == 2
    assert [r.s for r in head.filter(F.col("k") == 2).collect()] == [None]


def test_incremental_mv_multi_round_equals_full_recompute(spark, tmp_path):
    """Several rounds of append/merge on the source, one incremental
    refresh each — after every round the MV must equal a full
    recompute, a replayed refresh must be a no-op commit, and a group
    whose rows all disappear must drop out of the MV ('D' path)."""
    from iceberg_insert_spark.sources.incremental_mv import (
        refresh_agg_mv,
        refreshed_through,
    )
    from iceberg_insert_spark.sources.snapshots import SnapshotTable

    def mk(rows):
        return spark.createDataFrame(rows, "k long, g string, v double")

    src = SnapshotTable(str(tmp_path / "src"))
    mv = SnapshotTable(str(tmp_path / "mv"))

    def check():
        got = {
            (r.g, r.n_rows, r.sum_cents)
            for r in mv.read(spark).collect()
        }
        want = {
            (r.g, r.n_rows, r.sum_cents)
            for r in src.read(spark)
            .groupBy("g")
            .agg(
                F.count(F.lit(1)).alias("n_rows"),
                F.sum(F.round(F.col("v") * 100).cast("long")).alias(
                    "sum_cents"
                ),
            )
            .collect()
        }
        assert got == want

    src.append(mk([(1, "a", 1.50), (2, "a", 2.25), (3, "b", 10.0)]))
    assert refresh_agg_mv(spark, src, mv, "g", "v") == 1
    check()

    # round 2: append a new group + more of an existing one
    src.append(mk([(4, "c", 5.00), (5, "a", 0.25)]))
    # round 3: update k=1 (value change) and delete ALL of group b
    src.merge(
        spark,
        mk([(1, "a", 9.75), (3, "b", 0.0)]).withColumn(
            "_op", F.when(F.col("k") == 1, "U").otherwise("D")
        ),
        key="k",
    )
    assert refresh_agg_mv(spark, src, mv, "g", "v") == 3
    check()
    assert mv.read(spark).filter(F.col("g") == "b").count() == 0  # D path
    assert refreshed_through(mv) == 3

    # replayed refresh: no new source commit -> no MV commit
    before = mv.snapshots()
    assert refresh_agg_mv(spark, src, mv, "g", "v") == 3
    assert mv.snapshots() == before

    # crash-replay of the SAME range: the merge token dedups it
    tok = "mv-refresh-to-3"
    assert mv._token_index()[tok] in before
    src.append(mk([(6, "c", 1.00)]))
    assert refresh_agg_mv(spark, src, mv, "g", "v") == 4
    check()


def test_incremental_mv_recovers_from_replace_commits(spark, tmp_path):
    """A source compaction (replace commit) breaks changelog semantics
    mid-range: the incremental refresh must refuse loudly, and
    full_rebuild_agg_mv re-bootstraps the MV so incremental refreshes
    resume from the rebuilt point."""
    from iceberg_insert_spark.sources.incremental_mv import (
        full_rebuild_agg_mv,
        refresh_agg_mv,
    )
    from iceberg_insert_spark.sources.snapshots import SnapshotTable

    def mk(rows):
        return spark.createDataFrame(rows, "k long, g string, v double")

    src = SnapshotTable(str(tmp_path / "src"))
    mv = SnapshotTable(str(tmp_path / "mv"))
    src.append(mk([(1, "a", 1.0), (2, "b", 2.0)]))
    refresh_agg_mv(spark, src, mv, "g", "v")
    src.append(mk([(3, "a", 3.0)]))
    src.compact(spark)  # replace commit: changelog range now invalid
    with pytest.raises(ValueError, match="replace"):
        refresh_agg_mv(spark, src, mv, "g", "v")
    full_rebuild_agg_mv(spark, src, mv, "g", "v")
    # incremental service resumes after the rebuild checkpoint
    src.append(mk([(4, "c", 4.0)]))
    refresh_agg_mv(spark, src, mv, "g", "v")
    got = {(r.g, r.n_rows, r.sum_cents) for r in mv.read(spark).collect()}
    assert got == {("a", 2, 400), ("b", 1, 200), ("c", 1, 400)}


# -- copy-on-write DELETE / UPDATE ------------------------------------


def test_delete_where_rewrites_only_touched_files(spark, tmp_path):
    """The CoW plan's whole point: files the stats pruner proves
    disjoint from the predicate are carried into the new manifest BY
    PATH — never opened, never rewritten — while touched files leave
    the manifest. Time travel still sees the pre-delete state."""
    tbl = SnapshotTable(str(tmp_path / "t"), stats_cols=["rid"])
    mk = lambda lo, hi: spark.createDataFrame(
        [(i, i % 2 == 0) for i in range(lo, hi)], "rid long, keep boolean"
    ).coalesce(1)
    tbl.append(mk(0, 100))
    tbl.append(mk(100, 200))
    v_pre = tbl.append(mk(200, 300))
    pre_manifest = tbl._manifest(v_pre)
    low_files = {f for f in pre_manifest if f.startswith("_snap=1")}
    hi_files = {f for f in pre_manifest if f.startswith("_snap=3")}
    v = tbl.delete_where(
        spark, "rid BETWEEN 120 AND 180", stats_hint=("rid", 120, 180)
    )
    post = set(tbl._manifest(v))
    # untouched files carried verbatim; touched file replaced
    assert low_files <= post and hi_files <= post
    assert not any(f.startswith("_snap=2") for f in post)
    got = {r.rid for r in tbl.read(spark).collect()}
    assert got == set(range(0, 120)) | set(range(181, 300))
    # historic snapshot unaffected
    assert tbl.read(spark, as_of=v_pre).count() == 300


def test_delete_where_null_condition_keeps_row(spark, tmp_path):
    """SQL DELETE semantics: a NULL predicate does NOT delete."""
    tbl = SnapshotTable(str(tmp_path / "t"))
    tbl.append(
        spark.createDataFrame(
            [(1, 10), (2, None), (3, 30)], "rid long, v int"
        )
    )
    tbl.delete_where(spark, "v > 15")
    assert {r.rid for r in tbl.read(spark).collect()} == {1, 2}


def test_delete_where_no_match_is_a_noop(spark, tmp_path):
    tbl = SnapshotTable(str(tmp_path / "t"))
    v1 = tbl.append(spark.createDataFrame([(1,), (2,)], "rid long"))
    assert tbl.delete_where(spark, "rid > 99") == v1
    assert tbl.snapshots() == [v1]  # no empty rewrite committed


def test_delete_where_on_mor_table_folds_deletes(spark, tmp_path):
    """delete_where on a table with live equality deletes: the rewrite
    reads MoR (masked rows stay dead), and the rewritten file no longer
    needs the delete files while untouched old files still do."""
    tbl = SnapshotTable(str(tmp_path / "t"))
    mk = lambda rows: spark.createDataFrame(rows, "k long, v string")
    tbl.append(mk([(1, "a"), (2, "b"), (3, "c")]))
    ch = spark.createDataFrame(
        [(2, "b2", "U"), (3, None, "D")], "k long, v string, _op string"
    )
    tbl.merge(spark, ch, key="k")  # state: 1->a, 2->b2
    tbl.delete_where(spark, "v = 'a'")
    got = {(r.k, r.v) for r in tbl.read(spark).collect()}
    assert got == {(2, "b2")}


def test_update_where_reads_old_images_simultaneously(spark, tmp_path):
    """SET a = b, b = a must swap (all assignments read the OLD row),
    and non-matching rows survive byte-identical."""
    tbl = SnapshotTable(str(tmp_path / "t"))
    tbl.append(
        spark.createDataFrame(
            [(1, 10, 20), (2, 30, 40)], "rid long, a int, b int"
        )
    )
    tbl.update_where(spark, "rid = 1", {"a": "b", "b": "a"})
    got = {(r.rid, r.a, r.b) for r in tbl.read(spark).collect()}
    assert got == {(1, 20, 10), (2, 30, 40)}


def test_update_where_casts_back_to_column_type(spark, tmp_path):
    """An assignment whose expression widens (int arithmetic -> bigint)
    is cast back to the column's schema type: UPDATE never drifts the
    table schema."""
    tbl = SnapshotTable(str(tmp_path / "t"))
    tbl.append(spark.createDataFrame([(1, 10)], "rid long, v int"))
    before = tbl.read(spark).schema
    tbl.update_where(spark, "rid = 1", {"v": "v + CAST(1 AS BIGINT)"})
    after = tbl.read(spark)
    assert after.schema == before
    assert after.collect()[0].v == 11


def test_update_where_unknown_column_fails(spark, tmp_path):
    tbl = SnapshotTable(str(tmp_path / "t"))
    tbl.append(spark.createDataFrame([(1,)], "rid long"))
    with pytest.raises(ValueError, match="unknown columns"):
        tbl.update_where(spark, "rid = 1", {"nope": "1"})


def test_rewrite_conflicts_with_concurrent_commit(spark, tmp_path):
    """A commit landing between the rewrite's planning and its manifest
    swap must abort the rewrite (expected_base validation) — a blind
    swap would silently drop the concurrent commit's rows."""
    from iceberg_insert_spark.sources.snapshots import CommitConflict

    tbl = SnapshotTable(str(tmp_path / "t"))
    tbl.append(spark.createDataFrame([(1,), (2,)], "rid long"))

    def racing_transform(df, matched):
        tbl.append(spark.createDataFrame([(99,)], "rid long"))
        return df.filter(~matched)

    with pytest.raises(CommitConflict):
        tbl._rewrite_where(spark, "rid = 1", racing_transform, "delete", None)
    # the concurrent append survived; nothing was deleted
    assert {r.rid for r in tbl.read(spark).collect()} == {1, 2, 99}


def test_delete_update_refuse_changelog_streaming(spark, tmp_path):
    """CoW rewrites change visibility wholesale: the CDC/changelog
    reader must refuse to stream across them instead of replaying the
    rewrite as fresh inserts."""
    from iceberg_insert_spark.sources.snapshots import read_changelog

    tbl = SnapshotTable(str(tmp_path / "t"))
    v1 = tbl.append(spark.createDataFrame([(1,), (2,)], "rid long"))
    tbl.delete_where(spark, "rid = 1")
    v3 = tbl.append(spark.createDataFrame([(3,)], "rid long"))
    with pytest.raises(ValueError, match="delete"):
        read_changelog(tbl, spark, v1, v3)


def test_delete_where_partitioned_table(spark, tmp_path):
    """CoW delete on a partitioned table: rewritten rows re-partition
    under the same spec; partition records survive for kept files and
    partition-pruned reads stay correct afterwards."""
    tbl = SnapshotTable(str(tmp_path / "t"), partition_by=["grp"])
    tbl.append(
        spark.createDataFrame(
            [(i, "a" if i < 50 else "b") for i in range(100)],
            "rid long, grp string",
        )
    )
    tbl.delete_where(spark, "grp = 'a' AND rid < 10")
    assert tbl.read(spark).count() == 90
    a_files, _ = tbl.plan_files(partitions={"grp": "a"})
    da = tbl._read_files(spark, tbl._latest_published(), a_files)
    assert {r.rid for r in da.filter("grp = 'a'").collect()} == set(
        range(10, 50)
    )


def test_partitions_info_metadata_only(spark, tmp_path):
    """.partitions aggregates manifest partition records + sidecar
    footer counts; unpartitioned files group under the empty record and
    a file written without stats makes its partition's count None
    (unknown) instead of silently undercounting."""
    tbl = SnapshotTable(
        str(tmp_path / "t"), partition_by=["g"], stats_cols=["rid"]
    )
    tbl.append(
        spark.createDataFrame(
            [(i, "a" if i < 30 else "b") for i in range(100)],
            "rid long, g string",
        ).coalesce(1)
    )
    got = {
        (p["partition"]["g"], p["n_files"], p["n_records"])
        for p in tbl.partitions_info()
    }
    assert got == {("a", 1, 30), ("b", 1, 70)}
    # no-stats table: counts unknown, never wrong
    t2 = SnapshotTable(str(tmp_path / "u"), partition_by=["g"])
    t2.append(
        spark.createDataFrame([(1, "a")], "rid long, g string").coalesce(1)
    )
    [p] = t2.partitions_info()
    assert p["n_files"] == 1 and p["n_records"] is None
    # unpartitioned: one row under the empty record
    t3 = SnapshotTable(str(tmp_path / "v"), stats_cols=["rid"])
    t3.append(spark.createDataFrame([(1,), (2,)], "rid long").coalesce(1))
    [p3] = t3.partitions_info()
    assert p3["partition"] == {} and p3["n_records"] == 2


def test_cow_delete_lifecycle_composition(spark, tmp_path):
    """delete_where composed with the rest of the lifecycle: a tag
    pins the pre-delete snapshot through the delete AND a subsequent
    expire; the reclaimed pre-rewrite files disappear from disk; fsck
    stays clean throughout."""
    tbl = SnapshotTable(str(tmp_path / "t"))
    v1 = tbl.append(
        spark.createDataFrame([(i,) for i in range(100)], "rid long")
    )
    tbl.tag("pre-delete", v1)
    v2 = tbl.delete_where(spark, "rid < 50")
    assert tbl.read(spark).count() == 50
    # tag still reads the full pre-delete state
    assert tbl.read_tag(spark, "pre-delete").count() == 100
    assert all(not v for v in tbl.verify().values())  # fsck clean
    # expire everything before the delete: the tag pin keeps v1 alive
    tbl.expire(keep_from=v2)
    assert tbl.read_tag(spark, "pre-delete").count() == 100
    # untag -> the next expire reclaims the pre-delete files
    tbl.untag("pre-delete")
    deleted = tbl.expire(keep_from=v2)
    assert deleted  # v1's files are gone once unpinned
    assert tbl.read(spark).count() == 50
    assert all(not v for v in tbl.verify().values())  # fsck still clean


def test_snapshot_stream_refuses_then_skips_cow_delete(spark, tmp_path):
    """The streaming snapshot source treats a CoW delete commit like
    any replace: clean refusal by default (its delta is not an append
    batch), explicit skip with skip_non_append=True."""
    from iceberg_insert_spark.streaming.file_stream import (
        snapshot_stream_available_now,
    )

    tbl = SnapshotTable(str(tmp_path / "t"))
    tbl.append(spark.createDataFrame([(1,), (2,)], "rid long"))
    tbl.delete_where(spark, "rid = 1")
    tbl.append(spark.createDataFrame([(3,)], "rid long"))
    ckpt = str(tmp_path / "ckpt")
    got: list[int] = []

    def sink(batch, v):
        got.extend(r.rid for r in batch.collect())

    with pytest.raises(ValueError, match="delete"):
        snapshot_stream_available_now(spark, tbl, ckpt, sink)
    got.clear()
    snapshot_stream_available_now(
        spark, tbl, str(tmp_path / "ckpt2"), sink, skip_non_append=True
    )
    assert sorted(got) == [1, 2, 3]  # appends delivered, delete skipped


# -- add_files (zero-copy import) -------------------------------------


def test_add_files_is_zero_copy_and_composes(spark, tmp_path):
    """Import registers existing parquet via hard link (same inode, no
    data copied) and the imported rows then participate in the normal
    lifecycle: append on top, CoW delete, time travel."""
    src = str(tmp_path / "ext.parquet")
    spark.createDataFrame(
        [(i,) for i in range(50)], "rid long"
    ).coalesce(1).write.parquet(str(tmp_path / "extdir"))
    part = [
        f
        for f in os.listdir(tmp_path / "extdir")
        if f.endswith(".parquet")
    ][0]
    os.rename(str(tmp_path / "extdir" / part), src)

    tbl = SnapshotTable(str(tmp_path / "t"))
    v1 = tbl.add_files(spark, [src])
    assert tbl.read(spark).count() == 50
    assert tbl.history() == [(v1, "append")]
    # zero-copy: the registered file is the SAME inode
    [rel] = tbl._manifest(v1)
    assert os.stat(src).st_ino == os.stat(
        os.path.join(tbl.path, rel)
    ).st_ino
    # composes with the rest of the lifecycle
    tbl.append(spark.createDataFrame([(99,)], "rid long"))
    tbl.delete_where(spark, "rid < 10")
    assert tbl.read(spark).count() == 41
    assert tbl.read(spark, as_of=v1).count() == 50


def test_add_files_validates_check_constraints(spark, tmp_path):
    """add_files commits user values without going through _commit, so
    it must run the CHECK-constraint guard itself: a violating import is
    refused BEFORE any commit (head untouched), a clean one lands, and
    an unconstrained table imports with zero extra scans (advisor
    catch, r6: imports silently adopted violating rows)."""

    def _ext(name, rows):
        d = tmp_path / name
        spark.createDataFrame(rows, "k long, v double").coalesce(
            1
        ).write.parquet(str(d))
        return [
            os.path.join(d, f)
            for f in os.listdir(d)
            if f.endswith(".parquet")
        ]

    tbl = SnapshotTable(
        str(tmp_path / "t"), constraints={"pos": "v > 0"}
    )
    tbl.append(spark.createDataFrame([(1, 5.0)], "k long, v double"))
    head = tbl.snapshots()[-1]
    bad = _ext("bad", [(2, -1.0), (3, 2.0)])
    with pytest.raises(Exception, match="CHECK constraint 'pos'"):
        tbl.add_files(spark, bad)
    assert tbl.snapshots()[-1] == head  # head untouched
    assert tbl.read(spark).count() == 1
    good = _ext("good", [(4, 1.0), (5, 2.0)])
    tbl.add_files(spark, good)
    assert tbl.read(spark).count() == 3
    # constraints inherited from the MANIFEST guard a default handle too
    again = SnapshotTable(str(tmp_path / "t"))
    bad2 = _ext("bad2", [(6, -9.0)])
    with pytest.raises(Exception, match="CHECK constraint 'pos'"):
        again.add_files(spark, bad2)


def test_add_files_schema_mismatch_refused(spark, tmp_path):
    spark.createDataFrame([(1, "x")], "a long, b string").coalesce(
        1
    ).write.parquet(str(tmp_path / "ext"))
    ext = [
        os.path.join(tmp_path / "ext", f)
        for f in os.listdir(tmp_path / "ext")
        if f.endswith(".parquet")
    ]
    tbl = SnapshotTable(str(tmp_path / "t"))
    tbl.append(spark.createDataFrame([(1,)], "rid long"))
    with pytest.raises(ValueError, match="cannot project"):
        tbl.add_files(spark, ext)


def test_add_files_partitioned_and_idempotent(spark, tmp_path):
    """Partitioned import takes one partition record per call (hive
    usage); the token makes replays no-ops; missing/extra record is a
    clean error."""
    spark.createDataFrame([(1,), (2,)], "rid long").coalesce(
        1
    ).write.parquet(str(tmp_path / "ext"))
    ext = [
        os.path.join(tmp_path / "ext", f)
        for f in os.listdir(tmp_path / "ext")
        if f.endswith(".parquet")
    ]
    tbl = SnapshotTable(str(tmp_path / "t"), partition_by=["g"])
    with pytest.raises(ValueError, match="partitions record"):
        tbl.add_files(spark, ext)
    # note: imported files don't contain the partition column — a
    # partitioned import requires the data to carry the spec columns,
    # so build a conforming file instead
    spark.createDataFrame(
        [(1, "a"), (2, "a")], "rid long, g string"
    ).coalesce(1).write.parquet(str(tmp_path / "ext2"))
    ext2 = [
        os.path.join(tmp_path / "ext2", f)
        for f in os.listdir(tmp_path / "ext2")
        if f.endswith(".parquet")
    ]
    v = tbl.add_files(spark, ext2, partitions={"g": "a"}, token="imp-a")
    assert tbl.add_files(
        spark, ext2, partitions={"g": "a"}, token="imp-a"
    ) == v  # replay no-op
    assert tbl.read(spark).count() == 2
    files, _ = tbl.plan_files(partitions={"g": "a"})
    assert len(files) == 1
    files_b, _ = tbl.plan_files(partitions={"g": "b"})
    assert files_b == []


def test_add_files_boolean_partition_uses_canonical_encoding(
    spark, tmp_path
):
    """Review catch: the import's partition record must use the same
    canonical value spelling (_part_str) as every comparison path —
    str(True)='True' vs the writer's 'true' would make a pruned read
    silently drop the imported file's rows."""
    spark.createDataFrame(
        [(1, True), (2, True)], "rid long, flag boolean"
    ).coalesce(1).write.parquet(str(tmp_path / "ext"))
    ext = [
        os.path.join(tmp_path / "ext", f)
        for f in os.listdir(tmp_path / "ext")
        if f.endswith(".parquet")
    ]
    tbl = SnapshotTable(str(tmp_path / "t"), partition_by=["flag"])
    tbl.add_files(spark, ext, partitions={"flag": True})
    files, total = tbl.plan_files(partitions={"flag": True})
    assert len(files) == 1 and total == 1
    # and a native append into the same partition agrees on encoding
    tbl.append(
        spark.createDataFrame([(3, True)], "rid long, flag boolean")
    )
    files2, _ = tbl.plan_files(partitions={"flag": True})
    assert len(files2) == 2


def test_add_files_wrong_partition_record_refused(spark, tmp_path):
    """Review catch: the record is PROOF for pruning; files whose rows
    disagree with the declared record must be refused at import."""
    spark.createDataFrame(
        [(1, "b")], "rid long, g string"
    ).coalesce(1).write.parquet(str(tmp_path / "ext"))
    ext = [
        os.path.join(tmp_path / "ext", f)
        for f in os.listdir(tmp_path / "ext")
        if f.endswith(".parquet")
    ]
    tbl = SnapshotTable(str(tmp_path / "t"), partition_by=["g"])
    with pytest.raises(ValueError, match="does not match the files"):
        tbl.add_files(spark, ext, partitions={"g": "a"})


def test_add_files_duplicate_guards(spark, tmp_path):
    """Review catch (Iceberg's check_duplicate_files): the same file
    twice in one call, or re-importing an already-live file, would
    silently double rows — both refuse."""
    spark.createDataFrame([(1,)], "rid long").coalesce(1).write.parquet(
        str(tmp_path / "ext")
    )
    [ext] = [
        os.path.join(tmp_path / "ext", f)
        for f in os.listdir(tmp_path / "ext")
        if f.endswith(".parquet")
    ]
    tbl = SnapshotTable(str(tmp_path / "t"))
    with pytest.raises(ValueError, match="duplicate paths"):
        tbl.add_files(spark, [ext, ext])
    tbl.add_files(spark, [ext])
    with pytest.raises(ValueError, match="already registered"):
        tbl.add_files(spark, [ext])


def test_update_where_validates_eagerly(spark, tmp_path):
    """Review catches: a typo'd column must error even when the
    condition matches no rows (the planner short-circuits before the
    transform runs), and an empty assignment dict must not trigger a
    full no-change rewrite."""
    tbl = SnapshotTable(str(tmp_path / "t"))
    tbl.append(spark.createDataFrame([(1,)], "rid long"))
    with pytest.raises(ValueError, match="unknown columns"):
        tbl.update_where(spark, "rid = 999", {"typo_col": "1"})
    with pytest.raises(ValueError, match="no assignments"):
        tbl.update_where(spark, "rid = 1", {})


def test_partitions_info_bad_snapshot_is_clean_error(spark, tmp_path):
    tbl = SnapshotTable(str(tmp_path / "t"))
    tbl.append(spark.createDataFrame([(1,)], "rid long"))
    with pytest.raises(ValueError, match="does not exist"):
        tbl.partitions_info(as_of=99)


def test_rewrite_write_failure_leaves_no_partial_state(spark, tmp_path):
    """A rewrite whose data write fails mid-commit (executor error
    during the staged write) must leave the table exactly as it was:
    no new snapshot, no manifest change, no staging debris a reader
    could trip on, fsck clean."""
    tbl = SnapshotTable(str(tmp_path / "t"))
    v1 = tbl.append(
        spark.createDataFrame([(1,), (2,)], "rid long")
    )
    with pytest.raises(Exception):
        # assert_true throws per-row at EXECUTION time, i.e. inside
        # the staged parquet write — the commit's long phase
        tbl._rewrite_where(
            spark,
            "rid >= 1",
            lambda df, m: df.filter(F.expr("assert_true(rid < 0) IS NULL")),
            "delete",
            None,
        )
    assert tbl.snapshots() == [v1]
    assert {r.rid for r in tbl.read(spark).collect()} == {1, 2}
    assert all(not v for v in tbl.verify().values())
    leftovers = [
        f for f in os.listdir(tbl.path) if f.startswith("_staging-")
    ]
    assert leftovers == []


def test_concurrent_cow_rewrites_conflict_cleanly(spark, tmp_path):
    """Two CoW rewrites racing: the one whose base moved first aborts
    with CommitConflict (no silent lost update); a re-run against the
    new state then applies BOTH mutations."""
    from iceberg_insert_spark.sources.snapshots import CommitConflict

    tbl = SnapshotTable(str(tmp_path / "t"))
    tbl.append(
        spark.createDataFrame([(i,) for i in range(10)], "rid long")
    )

    def racing(df, matched):
        tbl.delete_where(spark, "rid = 9")  # rival lands mid-rewrite
        return df.filter(~matched)

    with pytest.raises(CommitConflict):
        tbl._rewrite_where(spark, "rid < 3", racing, "delete", None)
    # rival's delete survived; ours aborted cleanly
    assert {r.rid for r in tbl.read(spark).collect()} == set(range(9))
    # retry against the new state applies both
    tbl.delete_where(spark, "rid < 3")
    assert {r.rid for r in tbl.read(spark).collect()} == {3, 4, 5, 6, 7, 8}


def test_delete_where_partition_scoped_prunes_and_protects(
    spark, tmp_path
):
    """Partition-scoped CoW delete (the retention sweep): the planning
    scan prunes to the target partition's files from manifest records
    alone — other partitions' files are carried by path identity — and
    after a spec evolution, conservative-kept old-spec files lose ONLY
    the target partition's matching rows (the folded null-safe
    partition equality protects the rest)."""
    tbl = SnapshotTable(str(tmp_path / "t"), partition_by=["day"])
    mk = lambda day, lo, hi: spark.createDataFrame(
        [(i, day) for i in range(lo, hi)], "rid long, day string"
    ).coalesce(1)
    tbl.append(mk("d1", 0, 50))
    v2 = tbl.append(mk("d2", 50, 100))
    d2_files = {
        f
        for f in tbl._manifest(v2)
        if f not in set(tbl._manifest(v2 - 1))
    }
    v = tbl.delete_where(
        spark, "rid < 10", partitions={"day": "d1"}
    )
    post = set(tbl._manifest(v))
    assert d2_files <= post  # d2's file carried by path, never opened
    got = {r.rid for r in tbl.read(spark).collect()}
    assert got == set(range(10, 100))
    # spec evolution -> pre-spec files have no 'grp' record and are
    # conservative-kept candidates for a grp-scoped delete; the folded
    # equality must protect their rows
    tbl2 = SnapshotTable(str(tmp_path / "u"))
    tbl2.append(
        spark.createDataFrame(
            [(1, "a"), (2, "b")], "rid long, grp string"
        )
    )
    tbl2.evolve_partitioning(["grp"])
    t2 = SnapshotTable(str(tmp_path / "u"), partition_by=["grp"])
    t2.append(
        spark.createDataFrame([(3, "a")], "rid long, grp string")
    )
    t2.delete_where(spark, "rid >= 0", partitions={"grp": "a"})
    got2 = {(r.rid, r.grp) for r in t2.read(spark).collect()}
    assert got2 == {(2, "b")}  # both 'a' rows deleted, 'b' protected


# -- merge-on-read positional DELETE ----------------------------------


def test_delete_where_mor_writes_no_data_files(spark, tmp_path):
    """strategy='mor' deletes by DELETION VECTOR (Iceberg v3): every
    data file of the base manifest survives by path identity (zero
    rewrite), the read folds each touched file's bitmap row-locally,
    time travel still sees the pre-delete state, and fsck stays clean
    (the delete file is reachable metadata)."""
    tbl = SnapshotTable(str(tmp_path / "t"))
    v1 = tbl.append(
        spark.createDataFrame([(i,) for i in range(100)], "rid long")
    )
    pre_files = set(tbl._manifest(v1))
    v2 = tbl.delete_where(spark, "rid % 10 = 3", strategy="mor")
    assert set(tbl._manifest(v2)) == pre_files  # zero data files touched
    dels = tbl._meta(v2)["delete_files"]
    assert all(d["kind"] == "dv" for d in dels)
    got = {r.rid for r in tbl.read(spark).collect()}
    assert got == {i for i in range(100) if i % 10 != 3}
    assert tbl.read(spark, as_of=v1).count() == 100
    assert all(not v for v in tbl.verify().values())


def test_delete_where_mor_composes_with_equality_and_compact(
    spark, tmp_path
):
    """All three Iceberg v2 delete kinds on ONE table: equality deletes
    (merge), positional deletes (mor), and a CoW rewrite — reads agree
    with the model at every step, and compact folds everything back
    into plain data files."""
    tbl = SnapshotTable(str(tmp_path / "t"))
    mk = lambda rows: spark.createDataFrame(rows, "k long, v string")
    tbl.append(mk([(1, "a"), (2, "b"), (3, "c"), (4, "d")]))
    ch = spark.createDataFrame(
        [(2, "b2", "U"), (3, None, "D")], "k long, v string, _op string"
    )
    tbl.merge(spark, ch, key="k")  # eq deletes: {1:a, 2:b2, 4:d}
    tbl.delete_where(spark, "v = 'd'", strategy="mor")  # {1:a, 2:b2}
    got = {(r.k, r.v) for r in tbl.read(spark).collect()}
    assert got == {(1, "a"), (2, "b2")}
    # MoR delete of a MERGE-WRITTEN row (data file from the merge)
    tbl.delete_where(spark, "k = 2", strategy="mor")
    assert {(r.k, r.v) for r in tbl.read(spark).collect()} == {(1, "a")}
    # compact folds eq + pos deletes into plain files
    vc = tbl.compact(spark)
    assert "delete_files" not in tbl._meta(vc)
    assert {(r.k, r.v) for r in tbl.read(spark).collect()} == {(1, "a")}
    # CoW delete afterwards still works on the folded table
    tbl.delete_where(spark, "k = 1")
    assert tbl.read(spark).count() == 0


def test_delete_where_mor_noop_and_guards(spark, tmp_path):
    """No-match MoR delete commits nothing; CDC/changelog refuse
    across a positional-delete commit exactly like a CoW one; the
    append-only stream refuses/skips it."""
    from iceberg_insert_spark.sources.snapshots import read_changelog

    tbl = SnapshotTable(str(tmp_path / "t"))
    v1 = tbl.append(spark.createDataFrame([(1,), (2,)], "rid long"))
    assert tbl.delete_where(spark, "rid > 99", strategy="mor") == v1
    assert tbl.snapshots() == [v1]
    tbl.delete_where(spark, "rid = 1", strategy="mor")
    v3 = tbl.append(spark.createDataFrame([(3,)], "rid long"))
    with pytest.raises(ValueError, match="delete"):
        read_changelog(tbl, spark, v1, v3)


def test_delete_where_mor_rollback_restores(spark, tmp_path):
    """Rollback to the pre-delete snapshot drops the delete file from
    the live manifest: the rows come back, and expire afterwards can
    reclaim the unreferenced delete file."""
    tbl = SnapshotTable(str(tmp_path / "t"))
    v1 = tbl.append(
        spark.createDataFrame([(i,) for i in range(10)], "rid long")
    )
    tbl.delete_where(spark, "rid < 5", strategy="mor")
    assert tbl.read(spark).count() == 5
    v3 = tbl.rollback(to=v1)
    assert tbl.read(spark).count() == 10
    deleted = tbl.expire(keep_from=v3)
    assert any("_deletes" in p for p in deleted)  # delete file reclaimed
    assert tbl.read(spark).count() == 10


def test_cow_rewrite_over_live_positional_deletes(spark, tmp_path):
    """CoW delete on a table with LIVE positional deletes: the rewrite
    folds the pos deletes for touched files (reads are MoR), untouched
    files keep their entries applying, and no masked row resurrects."""
    tbl = SnapshotTable(str(tmp_path / "t"), stats_cols=["rid"])
    mk = lambda lo, hi: spark.createDataFrame(
        [(i,) for i in range(lo, hi)], "rid long"
    ).coalesce(1)
    tbl.append(mk(0, 50))
    tbl.append(mk(50, 100))
    # pos-delete rows in BOTH files
    tbl.delete_where(spark, "rid IN (5, 55)", strategy="mor")
    # CoW delete touching only the low file
    tbl.delete_where(spark, "rid < 10", stats_hint=("rid", 0, 9))
    got = {r.rid for r in tbl.read(spark).collect()}
    assert got == (set(range(10, 100)) - {55})
    # the untouched high file still carries its pos delete (55 dead),
    # and 5 did not resurrect through the rewrite


def test_update_where_mor_old_images_die_new_survive(spark, tmp_path):
    """MoR UPDATE: one commit = position-delete of the old images +
    data files of the new — no untouched row rewritten (base data
    files survive by path), the new images are not killed by the
    commit's own position entries, and a/b swap still reads old
    images simultaneously."""
    tbl = SnapshotTable(str(tmp_path / "t"))
    v1 = tbl.append(
        spark.createDataFrame(
            [(1, 10, 20), (2, 30, 40), (3, 50, 60)],
            "rid long, a int, b int",
        )
    )
    pre_files = set(tbl._manifest(v1))
    v2 = tbl.update_where(
        spark, "rid <= 2", {"a": "b", "b": "a"}, strategy="mor"
    )
    assert pre_files <= set(tbl._manifest(v2))  # base files untouched
    assert tbl._meta(v2)["delete_files"][0]["kind"] == "dv"
    got = {(r.rid, r.a, r.b) for r in tbl.read(spark).collect()}
    assert got == {(1, 20, 10), (2, 40, 30), (3, 50, 60)}
    # time travel: pre-update state intact
    assert {
        (r.rid, r.a, r.b)
        for r in tbl.read(spark, as_of=v1).collect()
    } == {(1, 10, 20), (2, 30, 40), (3, 50, 60)}
    # compact folds; values preserved
    tbl.compact(spark)
    assert {
        (r.rid, r.a, r.b) for r in tbl.read(spark).collect()
    } == got
    # eager validation + no-match no-op hold for the mor path too
    with pytest.raises(ValueError, match="unknown columns"):
        tbl.update_where(spark, "rid = 99", {"nope": "1"}, strategy="mor")
    cur = tbl._latest_published()
    assert (
        tbl.update_where(spark, "rid = 99", {"a": "1"}, strategy="mor")
        == cur
    )


def test_compound_range_pruning_on_zorder_layout(spark, tmp_path):
    """Multi-dimensional stats pruning: a LIST of range predicates is a
    conjunction — a file pruned on ANY dimension is skipped — so on a
    z-ordered layout the compound prune is at least as tight as either
    single-dimension prune, and the residual-filtered read over the
    pruned plan equals the unpruned filtered read exactly."""
    o = load_table(spark, SF_DIR, "orders")
    tbl = SnapshotTable(
        str(tmp_path / "zc2"), stats_cols=["o_custkey", "o_orderkey"]
    )
    tbl.append(o.repartition(8))
    tbl.compact_zorder(spark, "o_custkey", "o_orderkey", target_files=8)
    mx_k = o.agg(F.max("o_orderkey")).collect()[0][0]
    mx_c = o.agg(F.max("o_custkey")).collect()[0][0]
    where_k = ("o_orderkey", 1, mx_k // 8)
    where_c = ("o_custkey", 1, mx_c // 8)
    both = [where_k, where_c]
    kept_k, _ = tbl.plan_files(where=where_k)
    kept_c, _ = tbl.plan_files(where=where_c)
    kept_b, _ = tbl.plan_files(where=both)
    assert set(kept_b) <= set(kept_k) and set(kept_b) <= set(kept_c)
    want = (
        tbl.read(spark)
        .filter(
            (F.col("o_orderkey").between(1, mx_k // 8))
            & (F.col("o_custkey").between(1, mx_c // 8))
        )
        .count()
    )
    got = tbl.read(spark, where=both, plan=kept_b).count()
    assert got == want
    # single-tuple form still accepted everywhere (back-compat)
    assert tbl.read(spark, where=where_k).count() == tbl.read(
        spark, where=[where_k]
    ).count()


# -- per-file Bloom indexes (point-lookup pruning) --------------------


def test_bloom_index_prunes_and_never_drops_rows(spark, tmp_path):
    """Hash-scattered layout: every file's o_custkey range spans the
    domain (range stats useless), yet a point probe for each of 20
    customers must (a) keep every file that truly holds the key — zero
    false negatives, the read equals the unpruned filtered read — and
    (b) prune at least one file for some sparse key."""
    o = load_table(spark, SF_DIR, "orders")
    tbl = SnapshotTable(
        str(tmp_path / "t"), bloom_cols=["o_custkey"]
    )
    for r in range(6):
        tbl.append(o.filter(F.col("o_orderkey") % 6 == r).coalesce(1))
    truth = {
        row[0]: row[1]
        for row in o.groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("n"))
        .limit(20)
        .collect()
    }
    pruned_somewhere = False
    for ck, n in truth.items():
        kept, total = tbl.plan_files(eq=("o_custkey", ck))
        assert total == 6
        got = tbl.read(spark, eq=("o_custkey", ck), plan=kept).count()
        assert got == n, f"bloom dropped rows for custkey {ck}"
        pruned_somewhere |= len(kept) < total
    assert pruned_somewhere, "bloom never pruned a single file"


def test_bloom_absent_key_prunes_everything(spark, tmp_path):
    o = load_table(spark, SF_DIR, "orders")
    tbl = SnapshotTable(str(tmp_path / "t"), bloom_cols=["o_custkey"])
    tbl.append(o.coalesce(1))
    # a key provably outside the domain: bloom prunes all files with
    # overwhelming probability; the read is correct either way
    kept, total = tbl.plan_files(eq=("o_custkey", -987654321))
    assert tbl.read(spark, eq=("o_custkey", -987654321)).count() == 0
    assert len(kept) == 0


def test_bloom_conservative_without_index(spark, tmp_path):
    """No bloom_cols at write time -> probes keep every file; string
    and un-encodable probe values never prune blindly."""
    o = load_table(spark, SF_DIR, "orders")
    plain = SnapshotTable(str(tmp_path / "p"))
    plain.append(o.coalesce(1))
    plain.append(o.limit(10).coalesce(1))
    probe = SnapshotTable(str(tmp_path / "p"), bloom_cols=["o_custkey"])
    kept, total = probe.plan_files(eq=("o_custkey", 1))
    assert len(kept) == total == 2  # stats-less files must be kept
    # un-encodable probe value (no canonical bytes) -> no pruning
    import decimal

    kept2, _ = probe.plan_files(eq=("o_custkey", decimal.Decimal(1)))
    assert len(kept2) == 2


def test_bloom_string_column_and_composition(spark, tmp_path):
    """Blooms work on string keys, compose with range stats as a
    conjunction, and files_info hides the sketch bytes."""
    o = load_table(spark, SF_DIR, "orders")
    tbl = SnapshotTable(
        str(tmp_path / "t"),
        stats_cols=["o_orderkey"],
        bloom_cols=["o_orderpriority"],
    )
    mx = o.agg(F.max("o_orderkey")).collect()[0][0]
    k = F.col("o_orderkey")
    tbl.append(o.filter(k <= mx // 2).coalesce(1))
    tbl.append(o.filter(k > mx // 2).coalesce(1))
    pri = o.select("o_orderpriority").first()[0]
    kept, total = tbl.plan_files(
        where=("o_orderkey", 0, mx // 2), eq=("o_orderpriority", pri)
    )
    assert total == 2 and len(kept) == 1  # range cut it; bloom kept pri
    want = o.filter(
        (k <= mx // 2) & (F.col("o_orderpriority") == pri)
    ).count()
    got = tbl.read(
        spark,
        where=("o_orderkey", 0, mx // 2),
        eq=("o_orderpriority", pri),
    ).count()
    assert got == want
    # a priority string that exists nowhere prunes both files
    kept2, _ = tbl.plan_files(eq=("o_orderpriority", "9-NOSUCH"))
    assert kept2 == []
    for fi in tbl.files_info():
        assert all(not c.startswith("::") for c in fi["stats"])


# -- metadata-only COUNT(*) -------------------------------------------


def test_count_rows_metadata_deletes_and_compact(spark, tmp_path):
    """count_rows answers from sidecar ::rows when clean, refuses the
    fast path over live MoR deletes (per-file counts would overcount),
    and compaction restores it."""
    o = load_table(spark, SF_DIR, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    tbl = SnapshotTable(str(tmp_path / "t"), stats_cols=["o_orderkey"])
    for r in range(2):
        tbl.append(o.filter(F.col("o_orderkey") % 2 == r).coalesce(1))
    want = o.count()
    n, n_meta = tbl.count_rows(spark)
    assert (n, n_meta) == (want, 2)  # pure metadata
    # a merge leaves live equality deletes -> full-read fallback
    chg = (
        o.filter(F.col("o_orderkey") % 5 == 0)
        .withColumn("_op", F.lit("D"))
    )
    tbl.merge(spark, chg, key="o_orderkey")
    want2 = want - o.filter(F.col("o_orderkey") % 5 == 0).count()
    n2, n_meta2 = tbl.count_rows(spark)
    assert (n2, n_meta2) == (want2, 0)  # exact, but not from metadata
    # compact folds the deletes; the fast path returns
    tbl.compact(spark)
    n3, n_meta3 = tbl.count_rows(spark)
    assert n3 == want2 and n_meta3 >= 1
    # historic snapshot (pre-merge) still counts from metadata
    n4, n_meta4 = tbl.count_rows(spark, as_of=2)
    assert (n4, n_meta4) == (want, 2)


def test_bloom_cross_type_probe_is_conservative(spark, tmp_path):
    """Spark's residual equality COERCES (a string probe matches date
    rows); byte-level bloom membership cannot — so a probe whose type
    class differs from the recorded values must disable bloom pruning
    entirely, and a same-instant date/datetime probe must agree."""
    import datetime

    o = load_table(spark, SF_DIR, "orders")
    tbl = SnapshotTable(
        str(tmp_path / "t"), bloom_cols=["o_orderdate"]
    )
    for r in range(3):
        tbl.append(o.filter(F.col("o_orderkey") % 3 == r).coalesce(1))
    some = o.select("o_orderdate").first()[0]  # midnight datetime
    want = o.filter(F.col("o_orderdate") == some).count()
    # exact-typed probe: correct rows, possibly pruned files
    got = tbl.read(spark, eq=("o_orderdate", some)).count()
    assert got == want
    # STRING probe (caller writes the ISO date): the residual filter
    # coerces and matches, so the bloom must keep every file
    iso = some.date().isoformat()
    kept, total = tbl.plan_files(eq=("o_orderdate", iso))
    assert len(kept) == total == 3
    assert tbl.read(spark, eq=("o_orderdate", iso)).count() == want
    # date-object probe of a recorded midnight instant: same canonical
    # key (midnight normalizes to the bare date), so pruning works AND
    # no row is lost
    kept_d, _ = tbl.plan_files(eq=("o_orderdate", some.date()))
    kept_t, _ = tbl.plan_files(eq=("o_orderdate", some))
    assert set(kept_d) == set(kept_t)
    # tz-aware probe of the same instant agrees with the naive one
    aware = some.replace(tzinfo=datetime.timezone.utc)
    kept_a, _ = tbl.plan_files(eq=("o_orderdate", aware))
    assert set(kept_a) == set(kept_t)


def test_null_count_pruning_conservative_and_exact(spark, tmp_path):
    """IS NULL probes prune only files with a RECORDED zero null
    count; stats-less files keep; all-NULL files (no [min,max]) still
    record their null count from the footer."""
    o = load_table(spark, SF_DIR, "orders")
    k = F.col("o_orderkey")
    src = o.withColumn(
        "note",
        F.when(k % 3 == 0, F.lit(None).cast("string")).otherwise(
            F.lit("x")
        ),
    )
    tbl = SnapshotTable(str(tmp_path / "t"), stats_cols=["note"])
    for r in range(3):
        tbl.append(src.filter(k % 3 == r).coalesce(1))
    # one stats-less file via a plain handle: must be kept by IS NULL
    plain = SnapshotTable(str(tmp_path / "t"))
    plain.append(src.filter(k % 3 == 1).limit(7).coalesce(1))
    kept, total = tbl.plan_files(eq=("note", None))
    assert total == 4
    # file 0 (all nulls, no min/max recorded) + the stats-less file
    assert len(kept) == 2
    want = src.filter(F.col("note").isNull()).count()
    assert tbl.read(spark, eq=("note", None)).count() == want
    # the all-NULL file recorded no bounds but did record its count
    stats = tbl._load_stats()
    ents = [e for e in stats.values() if "::nulls::note" in e]
    assert len(ents) == 3
    assert sum(e["::nulls::note"] for e in ents) == want
    assert any(
        e["::nulls::note"] > 0 and "note" not in e for e in ents
    )


def test_not_null_pruning_drops_all_null_files(spark, tmp_path):
    """IS NOT NULL probes prune files recorded as entirely NULL in the
    column and keep everything else (including stats-less files); the
    read equals the unpruned isNotNull filter."""
    o = load_table(spark, SF_DIR, "orders")
    k = F.col("o_orderkey")
    src = o.withColumn(
        "note",
        F.when(k % 3 == 0, F.lit(None).cast("string")).otherwise(
            F.lit("x")
        ),
    )
    tbl = SnapshotTable(str(tmp_path / "t"), stats_cols=["note"])
    for r in range(3):
        tbl.append(src.filter(k % 3 == r).coalesce(1))
    kept, total = tbl.plan_files(not_null=["note"])
    assert total == 3 and len(kept) == 2  # the all-NULL file pruned
    want = src.filter(F.col("note").isNotNull()).count()
    got = tbl.read(spark, not_null=["note"], plan=kept).count()
    assert got == want
    # stats-less file keeps conservatively
    plain = SnapshotTable(str(tmp_path / "t"))
    plain.append(
        src.filter(k % 3 == 0).limit(5).coalesce(1)
    )  # more all-NULL rows, but unrecorded
    kept2, total2 = tbl.plan_files(not_null=["note"])
    assert total2 == 4 and len(kept2) == 3
    assert tbl.read(spark, not_null=["note"]).count() == want


def test_cherrypick_rejects_non_additive_and_missing(spark, tmp_path):
    o, tbl = _build(spark, tmp_path)
    ow = tbl.overwrite(o.filter(F.col("o_orderkey") % 5 == 0))
    with pytest.raises(ValueError, match="additive"):
        tbl.cherrypick(ow)
    with pytest.raises(ValueError, match="does not exist"):
        tbl.cherrypick(999)


def test_cherrypick_carries_main_deletes(spark, tmp_path):
    """A cherry-pick onto a main with live MoR delete files must carry
    them — dropping them would resurrect the deleted rows."""
    o = load_table(spark, SF_DIR, "orders")
    tbl = SnapshotTable(str(tmp_path / "t"))
    tbl.append(o.filter(F.col("o_orderkey") % 3 == 0))
    tbl.create_branch("fix")
    bv = tbl.append_to_branch(o.filter(F.col("o_orderkey") % 3 == 1), "fix")
    tbl.delete_where(spark, "o_orderkey % 6 = 0", strategy="mor")
    tbl.cherrypick(bv)
    got = {r.o_orderkey for r in tbl.read(spark).select("o_orderkey").collect()}
    want = {
        r.o_orderkey
        for r in o.filter(
            (F.col("o_orderkey") % 3 < 2) & (F.col("o_orderkey") % 6 != 0)
        ).select("o_orderkey").collect()
    }
    assert got == want


def test_cherrypick_idempotent_and_branch_untouched(spark, tmp_path):
    o = load_table(spark, SF_DIR, "orders")
    tbl = SnapshotTable(str(tmp_path / "t"))
    tbl.append(o.filter(F.col("o_orderkey") % 3 == 0))
    tbl.create_branch("fix")
    bv = tbl.append_to_branch(o.filter(F.col("o_orderkey") % 3 == 1), "fix")
    head_before = tbl._branch_head("fix")
    p1 = tbl.cherrypick(bv)
    p2 = tbl.cherrypick(bv)
    assert p1 == p2
    assert tbl._branch_head("fix") == head_before
    assert tbl.read(spark).count() == o.filter(
        F.col("o_orderkey") % 3 < 2
    ).count()


def test_add_column_with_default_fills_old_and_omitting_writers(
    spark, tmp_path
):
    """Iceberg v3 initial-default: pre-evolution rows resolve to the
    default with zero rewrites; appends omitting the column fill it
    (write-default role); explicit values — including explicit NULL —
    are never overridden; time travel before the evolve shows the old
    schema; compaction materializes the default and preserves it."""
    from pyspark.sql import types as T

    tbl = SnapshotTable(str(tmp_path / "t"))
    o = load_table(spark, SF_DIR, "orders").select(
        "o_orderkey", "o_orderstatus"
    )
    v1 = tbl.append(o.filter(F.col("o_orderkey") % 3 == 0))
    tbl.add_column("region", T.StringType(), default="unassigned")

    got = tbl.read(spark)
    assert got.filter(F.col("region") == "unassigned").count() == got.count()
    # omitting writer fills the default
    tbl.append(o.filter(F.col("o_orderkey") % 3 == 1))
    # explicit writer keeps its values, explicit NULL stays NULL
    exp = o.filter(F.col("o_orderkey") % 3 == 2).withColumn(
        "region",
        F.when(F.col("o_orderkey") % 2 == 0, F.lit("emea")),
    )
    tbl.append(exp)
    r = tbl.read(spark)
    assert r.count() == o.count()
    assert (
        r.filter(F.col("region") == "unassigned").count()
        == o.filter(F.col("o_orderkey") % 3 < 2).count()
    )
    assert (
        r.filter(F.col("region").isNull()).count()
        == o.filter(
            (F.col("o_orderkey") % 3 == 2) & (F.col("o_orderkey") % 2 == 1)
        ).count()
    )
    # time travel: pre-evolve snapshot has the OLD schema
    assert "region" not in tbl.read(spark, as_of=v1).columns
    # compaction materializes the default; values identical after
    before = sorted(
        map(tuple, r.select("o_orderkey", "region").collect())
    )
    tbl.compact(spark)
    after = sorted(
        map(
            tuple,
            tbl.read(spark).select("o_orderkey", "region").collect(),
        )
    )
    assert before == after
    with pytest.raises(ValueError, match="JSON-scalar"):
        tbl.add_column("bad", T.ArrayType(T.LongType()), default=[1])


# -- merge_into: full MERGE clause semantics ---------------------------


def _mi_table(spark, tmp_path):
    from iceberg_insert_spark.sources.snapshots import SnapshotTable

    t = SnapshotTable(str(tmp_path / "mi"))
    t.append(
        spark.createDataFrame(
            [(1, "F", 10.0), (2, "O", 20.0), (3, "O", 30.0), (4, "P", 40.0)],
            "k int, st string, amt double",
        ).coalesce(1)
    )
    return t


def test_merge_into_clause_matrix(spark, tmp_path):
    """delete-before-update first-match-wins; SET keeps unassigned
    target columns; insert condition filters; untouched rows survive."""
    t = _mi_table(spark, tmp_path)
    src = spark.createDataFrame(
        [(1, 100.0), (2, 200.0), (5, 500.0), (6, 1.0)],
        "k int, amt double",
    )
    t.merge_into(
        spark,
        src,
        key="k",
        matched=[
            ("delete", "t.st = 'F'"),
            ("update", None, {"amt": "s.amt + t.amt"}),
        ],
        not_matched=("insert", "s.amt > 100"),
    )
    got = sorted(
        (r.k, r.st, r.amt) for r in t.read(spark).collect()
    )
    assert got == [
        (2, "O", 220.0),
        (3, "O", 30.0),
        (4, "P", 40.0),
        (5, None, 500.0),
    ]


def test_merge_into_first_match_wins_order(spark, tmp_path):
    """The same rows under reversed clause order: a catch-all UPDATE
    first shadows the DELETE — clause order is semantics."""
    t = _mi_table(spark, tmp_path)
    src = spark.createDataFrame([(1, 99.0)], "k int, amt double")
    t.merge_into(
        spark,
        src,
        key="k",
        matched=[
            ("update", None, {"amt": "s.amt"}),
            ("delete", "t.st = 'F'"),
        ],
    )
    got = sorted((r.k, r.amt) for r in t.read(spark).collect())
    assert (1, 99.0) in got  # updated, NOT deleted


def test_merge_into_cardinality_violation(spark, tmp_path):
    t = _mi_table(spark, tmp_path)
    dup = spark.createDataFrame(
        [(2, 1.0), (2, 2.0)], "k int, amt double"
    )
    with pytest.raises(ValueError, match="cardinality"):
        t.merge_into(
            spark,
            dup,
            key="k",
            matched=[("update", None, {"amt": "s.amt"})],
        )
    # unmatched duplicate keys are NOT a violation (both insert paths
    # are unambiguous per SQL — they become two inserted rows)
    dup9 = spark.createDataFrame(
        [(9, 1.0), (9, 2.0)], "k int, amt double"
    )
    t.merge_into(
        spark,
        dup9,
        key="k",
        matched=[("update", None, {"amt": "s.amt"})],
        not_matched=("insert", None),
    )
    assert (
        t.read(spark).filter(F.col("k") == 9).count() == 2
    )


def test_merge_into_refusals(spark, tmp_path):
    from iceberg_insert_spark.sources.snapshots import SnapshotTable

    t = _mi_table(spark, tmp_path)
    src = spark.createDataFrame([(1, 1.0)], "k int, amt double")
    with pytest.raises(ValueError, match="at least one clause"):
        t.merge_into(spark, src, key="k")
    with pytest.raises(ValueError, match="matched clause must be"):
        t.merge_into(spark, src, key="k", matched=[("upsert", None)])
    with pytest.raises(ValueError, match="assignment dict"):
        t.merge_into(spark, src, key="k", matched=[("update", None)])
    with pytest.raises(ValueError, match="unknown column"):
        t.merge_into(
            spark, src, key="k",
            matched=[("update", None, {"ghost": "1"})],
        )
    with pytest.raises(ValueError, match="no key column"):
        t.merge_into(
            spark,
            spark.createDataFrame([(1,)], "z int"),
            key="k",
            matched=[("delete", None)],
        )
    empty = SnapshotTable(str(tmp_path / "empty"))
    with pytest.raises(ValueError, match="published"):
        empty.merge_into(
            spark, src, key="k", matched=[("delete", None)]
        )


def test_merge_into_composes_with_compact_and_time_travel(spark, tmp_path):
    t = _mi_table(spark, tmp_path)
    v0 = t._latest_published()
    src = spark.createDataFrame([(2, 5.0)], "k int, amt double")
    t.merge_into(
        spark, src, key="k",
        matched=[("update", None, {"amt": "s.amt"})],
    )
    t.compact(spark)
    got = sorted((r.k, r.amt) for r in t.read(spark).collect())
    assert (2, 5.0) in got and len(got) == 4
    # pre-merge snapshot still shows the old value
    old = t.read(spark, as_of=v0).filter(F.col("k") == 2).collect()
    assert old[0].amt == 20.0


def test_merge_into_refuses_key_assignment(spark, tmp_path):
    """Review regression: assigning the merge key would equality-delete
    an UNRELATED row holding the new key value — refused."""
    t = _mi_table(spark, tmp_path)
    src = spark.createDataFrame([(1, 9.0)], "k int, amt double")
    with pytest.raises(ValueError, match="may not assign the merge key"):
        t.merge_into(
            spark, src, key="k",
            matched=[("update", None, {"k": "t.k + 1", "amt": "s.amt"})],
        )


def test_merge_into_insert_only_allows_matched_duplicates(spark, tmp_path):
    """Review regression: insert-only merges never touch matched rows,
    so duplicate source keys that match the target are NOT a
    cardinality violation (Spark raises only for update/delete)."""
    t = _mi_table(spark, tmp_path)
    dup = spark.createDataFrame(
        [(2, 1.0), (2, 2.0), (8, 8.0)], "k int, amt double"
    )
    t.merge_into(spark, dup, key="k", not_matched=("insert", None))
    got = sorted((r.k, r.amt) for r in t.read(spark).collect())
    # matched key 2 untouched; unmatched 8 inserted once
    assert (2, 20.0) in got and (8, 8.0) in got and len(got) == 5


@pytest.mark.parametrize("seed", [20260815, 424243])
def test_cdc_lifecycle_model_with_renames(spark, tmp_path, seed):
    """The CDC model extended with random RENAME COLUMN ops on the
    value column: a seeded sequence of append / merge / compact /
    CoW+MoR delete / update / rollback / expire interleaved with
    metadata-only renames must match the pure-Python {rid: value}
    model after every step — under the CURRENT name — and every
    surviving snapshot must replay under the name it had THEN (the
    schema lives in the manifest). This drives the era-resolution
    machinery through live equality deletes, rollbacks across renames,
    and compactions that re-era the files."""
    import random

    rng = random.Random(seed)
    tbl = SnapshotTable(str(tmp_path / "cdcr"))
    vis: dict[int, dict[int, float]] = {}
    names: dict[int, str] = {}
    published: list[int] = []
    next_id = 0
    val_col = "val"
    n_renames = 0

    def df_of(mapping):
        return spark.createDataFrame(
            [(k, v) for k, v in sorted(mapping.items())],
            f"rid long, {val_col} double",
        ).coalesce(1)

    def fresh(n):
        nonlocal next_id
        ids = list(range(next_id, next_id + n))
        next_id += n
        return ids

    ids = fresh(6)
    v = tbl.append(df_of({i: float(i) for i in ids}))
    vis[v] = {i: float(i) for i in ids}
    names[v] = val_col
    published.append(v)

    for step in range(22):
        cur = vis[published[-1]]
        choices = [
            "append", "merge", "compact", "rename",
            "delete_where", "update_where", "delete_mor",
        ]
        if len(published) >= 2:
            choices += ["rollback", "expire"]
        op = rng.choice(choices)
        if op == "rename":
            n_renames += 1
            new = f"val_r{n_renames}"
            v = tbl.rename_column(val_col, new)
            val_col = new
            vis[v] = dict(cur)
            names[v] = val_col
            published.append(v)
        elif op == "append":
            ids = fresh(rng.randint(1, 3))
            batch = {i: float(i) for i in ids}
            v = tbl.append(df_of(batch))
            vis[v] = {**cur, **batch}
            names[v] = val_col
            published.append(v)
        elif op == "merge":
            keys = sorted(cur)
            dels = rng.sample(keys, min(len(keys), rng.randint(0, 2)))
            upds = rng.sample(
                [k for k in keys if k not in dels],
                min(len(keys) - len(dels), rng.randint(0, 2)),
            )
            ins = fresh(rng.randint(0, 2))
            rows = (
                [(k, 0.0, "D") for k in dels]
                + [(k, cur[k] + 100.0, "U") for k in upds]
                + [(k, float(k), "I") for k in ins]
            )
            if not rows:
                continue
            chg = spark.createDataFrame(
                rows, f"rid long, {val_col} double, _op string"
            )
            v = tbl.merge(spark, chg, key="rid")
            state = {k: x for k, x in cur.items() if k not in dels}
            for k in upds:
                state[k] = cur[k] + 100.0
            for k in ins:
                state[k] = float(k)
            vis[v] = state
            names[v] = val_col
            published.append(v)
        elif op == "compact":
            v = tbl.compact(spark)
            vis[v] = dict(cur)
            names[v] = val_col
            published.append(v)
        elif op in ("delete_where", "delete_mor"):
            k, r = rng.choice([(2, 0), (3, 1), (4, 2)])
            strat = "mor" if op == "delete_mor" else "cow"
            matching = {i for i in cur if i % k == r}
            v = tbl.delete_where(
                spark, f"rid % {k} = {r}", strategy=strat
            )
            if matching:
                vis[v] = {
                    i: x for i, x in cur.items() if i not in matching
                }
                names[v] = val_col
                published.append(v)
            else:
                assert v == published[-1]
        elif op == "update_where":
            k, r = rng.choice([(2, 1), (3, 0), (4, 1)])
            strat = rng.choice(["cow", "mor"])
            matching = {i for i in cur if i % k == r}
            v = tbl.update_where(
                spark,
                f"rid % {k} = {r}",
                {val_col: f"{val_col} + 1000.0"},
                strategy=strat,
            )
            if matching:
                vis[v] = {
                    i: (x + 1000.0 if i in matching else x)
                    for i, x in cur.items()
                }
                names[v] = val_col
                published.append(v)
            else:
                assert v == published[-1]
        elif op == "rollback":
            to = rng.choice(published)
            v = tbl.rollback(to=to)
            vis[v] = dict(vis[to])
            # rollback restores snapshot `to`'s SCHEMA too
            names[v] = names[to]
            val_col = names[to]
            published.append(v)
        else:  # expire
            keep = rng.choice(published[1:-1] or published)
            try:
                tbl.expire(keep_from=keep)
            except ValueError:
                continue
            for w in [w for w in vis if w < keep]:
                del vis[w]
            published = [w for w in published if w >= keep]
        got = {
            r["rid"]: r[val_col] for r in tbl.read(spark).collect()
        }
        assert got == vis[published[-1]], f"step {step} ({op})"
    assert n_renames >= 1  # the seed must actually exercise renames
    for v in tbl.snapshots():
        df = tbl.read(spark, as_of=v)
        assert names[v] in df.columns, f"snapshot {v} schema"
        got = {r["rid"]: r[names[v]] for r in df.collect()}
        assert got == vis[v], f"snapshot {v}"


def test_write_distribution_modes(spark, tmp_path):
    """'hash' writes exactly one file per partition value per commit;
    'none' writes one per (task, value); 'range' clusters rows by
    (partition, stats_cols) so per-file stats ranges are DISJOINT.
    Content identical in all modes. Invalid modes refused."""
    src = spark.createDataFrame(
        [(i, ["A", "B", "C"][i % 3], float(i)) for i in range(300)],
        "k int, p string, v double",
    ).repartition(6)
    tables = {}
    for mode in ("none", "hash", "range"):
        t = SnapshotTable(
            str(tmp_path / mode),
            partition_by=["p"],
            stats_cols=["k"],
            write_distribution=mode,
        )
        t.append(src)
        tables[mode] = t
    n = {
        m: len(t._manifest(t._latest_published()))
        for m, t in tables.items()
    }
    assert n["hash"] == 3
    assert n["none"] >= 6  # every task holds every value here
    want = sorted((i, float(i)) for i in range(300))
    for t in tables.values():
        got = sorted((r.k, r.v) for r in t.read(spark).collect())
        assert got == want
    # range mode: within each partition value, the files' k-ranges are
    # pairwise disjoint (the write-time clustered layout)
    byp: dict = {}
    for fi in tables["range"].files_info():
        p = next(
            seg.split("=", 1)[1]
            for seg in fi["path"].split("/")
            if seg.startswith("__part_p=")
        )
        byp.setdefault(p, []).append(tuple(fi["stats"]["k"]))
    for spans in byp.values():
        spans = sorted(spans)
        for (lo1, hi1), (lo2, hi2) in zip(spans, spans[1:]):
            assert hi1 < lo2, spans
    # partition pruning unaffected
    kept, total = tables["hash"].plan_files(partitions={"p": "B"})
    assert (len(kept), total) == (1, 3)
    # the mode PERSISTS: a default handle re-opening the hash table
    # keeps one-file-per-value (Iceberg table-property semantics)
    reopened = SnapshotTable(
        str(tmp_path / "hash"), partition_by=["p"], stats_cols=["k"]
    )
    reopened.append(src)
    assert len(reopened._manifest(reopened._latest_published())) == 6
    # ... and compaction carries the recorded mode forward
    reopened.compact(spark)
    meta = reopened._meta(reopened._latest_published())
    assert meta.get("write_distribution") == "hash"
    with pytest.raises(ValueError, match="write_distribution"):
        SnapshotTable(str(tmp_path / "bad"), write_distribution="zorder")


def test_check_constraints_enforced_at_write(spark, tmp_path):
    """Write-time CHECK constraints: a violating batch fails in staging
    (head untouched, staging swept), NULL passes (SQL CHECK semantics),
    the property persists across handles, {} clears it, engine rewrites
    (compact) skip the guard, and a CoW UPDATE that would introduce a
    violation is refused."""
    t = SnapshotTable(
        str(tmp_path / "t"),
        constraints={"positive_v": "v > 0", "k_known": "k IN (1, 2, 3)"},
    )
    clean = spark.createDataFrame([(1, 10.0), (2, None)], "k int, v double")
    v1 = t.append(clean)  # NULL v passes: CHECK is violated only on FALSE
    with pytest.raises(Exception, match="CHECK constraint"):
        t.append(spark.createDataFrame([(3, -1.0)], "k int, v double"))
    with pytest.raises(Exception, match="CHECK constraint"):
        t.append(spark.createDataFrame([(9, 1.0)], "k int, v double"))
    assert t.snapshots()[-1] == v1
    assert not [
        p for p in os.listdir(str(tmp_path / "t")) if p.startswith("_staging")
    ]
    # persists: a default reopened handle still enforces + compact is exempt
    re = SnapshotTable(str(tmp_path / "t"))
    with pytest.raises(Exception, match="CHECK constraint"):
        re.append(spark.createDataFrame([(1, -5.0)], "k int, v double"))
    re.compact(spark)
    assert re._meta(re._latest_published()).get("constraints") == {
        "positive_v": "v > 0",
        "k_known": "k IN (1, 2, 3)",
    }
    # CoW update introducing a violation is refused, head unchanged
    head = re.snapshots()[-1]
    with pytest.raises(Exception, match="CHECK constraint"):
        re.update_where(spark, "k = 1", {"v": "-v"})
    assert re.snapshots()[-1] == head
    # explicit {} clears the property; dirty appends then commit
    cleared = SnapshotTable(str(tmp_path / "t"), constraints={})
    cleared.append(spark.createDataFrame([(7, -1.0)], "k int, v double"))
    assert "constraints" not in cleared._meta(cleared._latest_published())
    # constructor validation
    with pytest.raises(ValueError, match="constraints"):
        SnapshotTable(str(tmp_path / "bad"), constraints={"x": ""})


def test_min_max_guards_fall_back_exactly(spark, tmp_path):
    """min_max: metadata answer equals the scan answer on the fast path;
    delete files, renames, and all-NULL/missing-stats files route to the
    exact fallback (or contribute nothing, for provably-all-NULL)."""
    t = SnapshotTable(str(tmp_path / "t"), stats_cols=["v"])
    t.append(spark.createDataFrame([(1, 5.0), (2, 9.0)], "k int, v double"))
    t.append(spark.createDataFrame([(3, 1.0), (4, 7.0)], "k int, v double"))
    assert t.min_max(spark, "v") == (1.0, 9.0, True)
    # all-NULL file stays on the fast path and contributes nothing
    t.append(
        spark.createDataFrame(
            [(5, None)], "k int, v double"
        )
    )
    assert t.min_max(spark, "v") == (1.0, 9.0, True)
    # un-maintained column: exact via fallback
    assert t.min_max(spark, "k") == (1, 5, False)
    # a live MoR delete removes the max row: fallback, exact
    t.delete_where(spark, "k = 2", strategy="mor")
    lo, hi, meta = t.min_max(spark, "v")
    assert (lo, hi, meta) == (1.0, 7.0, False)
    t.compact(spark)
    assert t.min_max(spark, "v") == (1.0, 7.0, True)
    # rename forces the fallback (sidecars key by write-time names)
    t.rename_column("v", "val")
    lo, hi, meta = t.min_max(spark, "val")
    assert (lo, hi, meta) == (1.0, 7.0, False)


def test_min_max_string_stats_take_exact_path(spark, tmp_path):
    """String/binary footer stats may be writer-TRUNCATED (the stored
    bound is a prefix/incremented-prefix, not a data value) and pyarrow
    < 17 exposes no exactness flags — min_max must answer string columns
    via the real read, never from the sidecar (advisor catch, r6). The
    answer stays exact either way; only from_metadata flips."""
    t = SnapshotTable(str(tmp_path / "t"), stats_cols=["s", "v"])
    long_lo = "a" * 300 + "end"
    long_hi = "z" * 300 + "end"
    t.append(
        spark.createDataFrame(
            [(long_lo, 1.0), (long_hi, 2.0)], "s string, v double"
        )
    )
    lo, hi, from_meta = t.min_max(spark, "s")
    assert from_meta is False  # forced exact path
    assert (lo, hi) == (long_lo, long_hi)  # real data values, not bounds
    # numeric sibling still answers from metadata on the same table
    assert t.min_max(spark, "v") == (1.0, 2.0, True)


def test_min_max_date_stats_return_native_types(spark, tmp_path):
    """Date/timestamp stats are stored as ISO strings in the sidecar;
    min_max must hand back NATIVE date/datetime objects on the fast path
    so both paths return the same type (review catch)."""
    import datetime

    t = SnapshotTable(str(tmp_path / "t"), stats_cols=["d", "ts"])
    t.append(
        spark.createDataFrame(
            [
                (datetime.date(2024, 1, 3), datetime.datetime(2024, 1, 3, 8)),
                (datetime.date(2024, 2, 1), datetime.datetime(2024, 2, 1, 9)),
            ],
            "d date, ts timestamp_ntz",
        )
    )
    lo, hi, meta = t.min_max(spark, "d")
    assert meta is True
    assert (lo, hi) == (datetime.date(2024, 1, 3), datetime.date(2024, 2, 1))
    slo, shi, smeta = (
        t.read(spark).agg(F.min("d"), F.max("d")).collect()[0][0],
        t.read(spark).agg(F.min("d"), F.max("d")).collect()[0][1],
        False,
    )
    assert type(lo) is type(slo) and type(hi) is type(shi)
    tlo, thi, tmeta = t.min_max(spark, "ts")
    assert tmeta is True
    assert isinstance(tlo, datetime.datetime) and isinstance(
        thi, datetime.datetime
    )
    assert (tlo, thi) == (
        datetime.datetime(2024, 1, 3, 8),
        datetime.datetime(2024, 2, 1, 9),
    )


def test_constraint_ddl_add_validate_drop(spark, tmp_path):
    """ALTER TABLE ADD/DROP CONSTRAINT: validated add refuses when live
    rows violate; a clean add enforces on the NEXT append from a fresh
    default handle (metadata inheritance); drop stops enforcement;
    unknown-name drop and duplicate add are refused; validate=False
    records without scanning."""
    t = SnapshotTable(str(tmp_path / "t"))
    t.append(spark.createDataFrame([(1, 5.0), (2, -3.0)], "k int, v double"))
    with pytest.raises(ValueError, match="existing rows violate"):
        t.add_constraint(spark, "pos", "v > 0")
    t.delete_where(spark, "v < 0")
    t.add_constraint(spark, "pos", "v > 0")
    with pytest.raises(ValueError, match="already exists"):
        t.add_constraint(spark, "pos", "v > 0")
    fresh = SnapshotTable(str(tmp_path / "t"))
    with pytest.raises(Exception, match="CHECK constraint"):
        fresh.append(spark.createDataFrame([(3, -1.0)], "k int, v double"))
    fresh.append(spark.createDataFrame([(3, 1.0)], "k int, v double"))
    assert fresh.drop_constraint("pos") > 0
    with pytest.raises(ValueError, match="does not exist"):
        fresh.drop_constraint("pos")
    fresh.append(spark.createDataFrame([(4, -9.0)], "k int, v double"))
    assert fresh.read(spark).count() == 3
    # validate=False records even over violating data (documented escape)
    t2 = SnapshotTable(str(tmp_path / "t2"))
    t2.append(spark.createDataFrame([(1, -1.0)], "k int, v double"))
    t2.add_constraint(spark, "pos", "v > 0", validate=False)
    with pytest.raises(Exception, match="CHECK constraint"):
        t2.append(spark.createDataFrame([(2, -2.0)], "k int, v double"))


@pytest.mark.parametrize("seed", [20260815, 424243])
def test_cdc_lifecycle_model_with_constraints(spark, tmp_path, seed):
    """Lifecycle model with LIVE CHECK constraints: random append / merge
    / CoW+MoR update / compact / rollback interleaved with ADD/DROP
    CONSTRAINT ('val < limit'). The model predicts from its own state
    whether each write violates an active constraint — a violating write
    must REFUSE and leave the head byte-identical; rollback restores the
    TARGET snapshot's constraint set (constraints are manifest state,
    not a side channel); invalid adds (existing rows violate) refuse."""
    import random

    rng = random.Random(seed)
    tbl = SnapshotTable(str(tmp_path / "cons"))
    vis: dict[int, dict[int, float]] = {}
    cons_at: dict[int, dict[str, float]] = {}
    published: list[int] = []
    next_id = 0
    next_cname = 0

    def df_of(mapping):
        return spark.createDataFrame(
            [(k, v) for k, v in sorted(mapping.items())],
            "rid long, val double",
        ).coalesce(1)

    def fresh(n):
        nonlocal next_id
        ids = list(range(next_id, next_id + n))
        next_id += n
        return ids

    def violates(state, cons):
        return any(v >= lim for v in state.values() for lim in cons.values())

    ids = fresh(5)
    v = tbl.append(df_of({i: float(i) for i in ids}))
    vis[v] = {i: float(i) for i in ids}
    cons_at[v] = {}
    published.append(v)

    for step in range(26):
        cur = vis[published[-1]]
        cons = cons_at[published[-1]]
        choices = ["append", "merge", "update_where", "compact",
                   "add_constraint"]
        if cons:
            choices.append("drop_constraint")
        if len(published) >= 2:
            choices.append("rollback")
        op = rng.choice(choices)
        if op == "append":
            ids = fresh(rng.randint(1, 2))
            bump = rng.choice([0.0, 10_000.0])  # sometimes deliberately huge
            batch = {i: float(i) + bump for i in ids}
            if violates(batch, cons):
                with pytest.raises(Exception, match="CHECK constraint"):
                    tbl.append(df_of(batch))
                assert tbl.snapshots()[-1] == published[-1]
            else:
                v = tbl.append(df_of(batch))
                vis[v] = {**cur, **batch}
                cons_at[v] = dict(cons)
                published.append(v)
        elif op == "merge":
            keys = sorted(cur)
            upds = rng.sample(keys, min(len(keys), rng.randint(0, 2)))
            ins = fresh(rng.randint(0, 1))
            rows = (
                [(k, cur[k] + 100.0, "U") for k in upds]
                + [(k, float(k), "I") for k in ins]
            )
            if not rows:
                continue
            chg = spark.createDataFrame(
                rows, "rid long, val double, _op string"
            )
            new_vals = {k: cur[k] + 100.0 for k in upds}
            new_vals.update({k: float(k) for k in ins})
            if violates(new_vals, cons):
                with pytest.raises(Exception, match="CHECK constraint"):
                    tbl.merge(spark, chg, key="rid")
                assert tbl.snapshots()[-1] == published[-1]
            else:
                v = tbl.merge(spark, chg, key="rid")
                state = dict(cur)
                state.update(new_vals)
                vis[v] = state
                cons_at[v] = dict(cons)
                published.append(v)
        elif op == "update_where":
            k, r = rng.choice([(2, 1), (3, 0)])
            strat = rng.choice(["cow", "mor"])
            matching = {i for i in cur if i % k == r}
            if not matching:
                continue
            new_vals = {i: cur[i] + 1000.0 for i in matching}
            if violates(new_vals, cons):
                with pytest.raises(Exception, match="CHECK constraint"):
                    tbl.update_where(
                        spark, f"rid % {k} = {r}",
                        {"val": "val + 1000.0"}, strategy=strat,
                    )
                assert tbl.snapshots()[-1] == published[-1]
            else:
                v = tbl.update_where(
                    spark, f"rid % {k} = {r}",
                    {"val": "val + 1000.0"}, strategy=strat,
                )
                vis[v] = {**cur, **new_vals}
                cons_at[v] = dict(cons)
                published.append(v)
        elif op == "compact":
            v = tbl.compact(spark)
            vis[v] = dict(cur)
            cons_at[v] = dict(cons)
            published.append(v)
        elif op == "add_constraint":
            if not cur:
                continue
            name = f"c{next_cname}"
            next_cname += 1
            if rng.random() < 0.3:
                # invalid add: limit below an existing value -> refused
                lim = min(cur.values())
                with pytest.raises(ValueError, match="existing rows"):
                    tbl.add_constraint(spark, name, f"val < {lim}")
                assert tbl.snapshots()[-1] == published[-1]
            else:
                lim = max(cur.values()) + rng.choice([150.0, 2000.0])
                v = tbl.add_constraint(spark, name, f"val < {lim}")
                vis[v] = dict(cur)
                cons_at[v] = {**cons, name: lim}
                published.append(v)
        elif op == "drop_constraint":
            name = rng.choice(sorted(cons))
            v = tbl.drop_constraint(name)
            vis[v] = dict(cur)
            cons_at[v] = {k: x for k, x in cons.items() if k != name}
            published.append(v)
        else:  # rollback
            to = rng.choice(published)
            v = tbl.rollback(to=to)
            vis[v] = dict(vis[to])
            cons_at[v] = dict(cons_at[to])
            published.append(v)
        got = {r.rid: r.val for r in tbl.read(spark).collect()}
        assert got == vis[published[-1]], f"step {step} ({op})"
        live = tbl._meta(published[-1]).get("constraints") or {}
        assert set(live) == set(cons_at[published[-1]]), f"step {step} ({op})"


def test_forget_erases_bytes_and_history(spark, tmp_path):
    """GDPR forget(): matching rows vanish from the HEAD, from TIME
    TRAVEL (older snapshots dropped), and from the raw surviving BYTES —
    including rows an earlier MoR delete had merely hidden inside data
    files; refusals while tags or staged snapshots pin history."""
    t = SnapshotTable(str(tmp_path / "t"))
    rows = [(i, f"u{i % 3}") for i in range(12)]
    t.append(spark.createDataFrame(rows[:6], "rid int, owner string"))
    t.append(spark.createDataFrame(rows[6:], "rid int, owner string"))
    # hide one matching row via MoR first: its bytes stay in the file
    t.delete_where(spark, "rid = 0", strategy="mor")
    # tag blocks erasure
    t.tag("pin", t.snapshots()[0])
    with pytest.raises(ValueError, match="tags/branches"):
        t.forget(spark, "owner = 'u0'")
    t.untag("pin")
    sv = t.stage_append(
        spark.createDataFrame([(99, "u0")], "rid int, owner string"),
        wap_id="w1",
    )
    with pytest.raises(ValueError, match="staged"):
        t.forget(spark, "owner = 'u0'")
    # clear the staged snapshot: move the head forward and expire it
    t.rollback(to=t._latest_published())
    t.expire(keep_from=t._latest_published())
    rep = t.forget(spark, "owner = 'u0'")
    # u0 owners: rid 0,3,6,9 -> matched counts only VISIBLE rows (rid 0
    # was MoR-hidden, then folded away by the compact step)
    assert rep["matched"] == 3 and rep["residual_matches"] == 0
    got = sorted(r.rid for r in t.read(spark).collect())
    assert got == [1, 2, 4, 5, 7, 8, 10, 11]
    # single surviving snapshot: no time travel to the pre-forget world
    assert len(t.snapshots()) == 1
    # raw bytes: no surviving file contains an erased owner
    files = t._manifest(t.snapshots()[-1])
    raw = spark.read.parquet(
        *[f"{tmp_path}/t/{f}" for f in files]
    )
    assert raw.filter(F.col("owner") == "u0").count() == 0


def test_forget_verifies_across_schema_eras(spark, tmp_path):
    """forget() on a table whose surviving files PREDATE a rename: the
    verification must evaluate the predicate on the old-era files under
    the CURRENT name (era resolution), not crash or vacuously pass
    (review catch)."""
    t = SnapshotTable(str(tmp_path / "t"))
    t.append(
        spark.createDataFrame(
            [(1, "u0"), (2, "u1"), (3, "u0")], "rid int, owner string"
        )
    )
    t.rename_column("owner", "cust")
    t.append(
        spark.createDataFrame([(4, "u0"), (5, "u2")], "rid int, cust string")
    )
    rep = t.forget(spark, "cust = 'u0'")
    assert rep["matched"] == 3 and rep["residual_matches"] == 0
    got = sorted((r.rid, r.cust) for r in t.read(spark).collect())
    assert got == [(2, "u1"), (5, "u2")]


def test_add_constraint_detects_scan_lock_race(spark, tmp_path):
    """The TOCTOU third order, deterministically interleaved: a write
    that lands BETWEEN add_constraint's validation scan and its commit
    lock must abort the add with CommitConflict — otherwise the table
    would publish a CHECK guarantee its live rows violate."""
    from iceberg_insert_spark.sources.snapshots import CommitConflict

    t = SnapshotTable(str(tmp_path / "t"))
    t.append(spark.createDataFrame([(1, 5.0)], "k int, v double"))
    racer = SnapshotTable(str(tmp_path / "t"))
    real_read = t.read
    fired = {"done": False}

    def read_then_race(*args, **kwargs):
        df = real_read(*args, **kwargs)
        if not fired["done"]:
            fired["done"] = True
            # violating batch lands after the scan captured its base
            racer.append(
                spark.createDataFrame([(2, -7.0)], "k int, v double")
            )
        return df

    t.read = read_then_race
    with pytest.raises(CommitConflict, match="advanced during"):
        t.add_constraint(spark, "pos", "v > 0")
    live = SnapshotTable(str(tmp_path / "t"))
    assert "constraints" not in live._meta(live._latest_published())
    # the retry against the current state correctly refuses outright
    with pytest.raises(ValueError, match="existing rows violate"):
        live.add_constraint(spark, "pos", "v > 0")


def test_shallow_clone_zero_copy_and_divergence(spark, tmp_path):
    """clone_to(): the clone reads identically to the source head with
    ZERO byte copy (hardlinked inodes), diverges independently in both
    directions, keeps pruning alive via re-keyed sidecars, survives
    source expiry of shared files (inode refcount), and refuses on MoR
    state / lineage / DDL history."""
    src = SnapshotTable(str(tmp_path / "src"), stats_cols=["v"])
    src.append(spark.createDataFrame([(1, 5.0), (2, 9.0)], "k int, v double"))
    src.append(spark.createDataFrame([(3, 1.0)], "k int, v double"))
    clone = src.clone_to(str(tmp_path / "clone"))
    assert sorted(
        (r.k, r.v) for r in clone.read(spark).collect()
    ) == [(1, 5.0), (2, 9.0), (3, 1.0)]
    # zero-copy: every non-empty cloned file shares its inode
    linked = 0
    for rel in clone._manifest(1):
        st = os.stat(str(tmp_path / "clone" / rel))
        if st.st_size > 0:
            assert st.st_nlink >= 2, rel
            linked += 1
    assert linked > 0
    # stats sidecar re-keyed: min_max answers from metadata immediately
    assert clone.min_max(spark, "v") == (1.0, 9.0, True)
    # divergence: each side's commits invisible to the other
    clone.append(spark.createDataFrame([(9, 9.9)], "k int, v double"))
    src.delete_where(spark, "k = 1")
    assert src.read(spark).count() == 2
    assert clone.read(spark).count() == 4
    # source expire after a full overwrite: shared inodes survive for
    # the clone even though the source unlinked its names
    src.overwrite(spark.createDataFrame([(7, 7.0)], "k int, v double"))
    src.expire(keep_from=src.snapshots()[-1])
    assert clone.read(spark).count() == 4
    # refusals
    m = SnapshotTable(str(tmp_path / "m"))
    m.append(spark.createDataFrame([(1, 2.0)], "k int, v double"))
    m.delete_where(spark, "k = 1", strategy="mor")
    with pytest.raises(ValueError, match="delete files"):
        m.clone_to(str(tmp_path / "m2"))
    lin = SnapshotTable(str(tmp_path / "lin"), row_lineage=True)
    lin.append(spark.createDataFrame([(1, 2.0)], "k int, v double"))
    with pytest.raises(ValueError, match="lineage"):
        lin.clone_to(str(tmp_path / "lin2"))
    ddl = SnapshotTable(str(tmp_path / "ddl"))
    ddl.append(spark.createDataFrame([(1, 2.0)], "k int, v double"))
    ddl.rename_column("v", "val")
    with pytest.raises(ValueError, match="pre-evolution"):
        ddl.clone_to(str(tmp_path / "ddl2"))
    # compact rewrites every live file at the current era and unblocks;
    # the clone starts a FRESH DDL history under the current names
    ddl.compact(spark)
    dclone = ddl.clone_to(str(tmp_path / "ddl2"))
    assert [(r.k, r.val) for r in dclone.read(spark).collect()] == [(1, 2.0)]
    dmeta = dclone._meta(1)
    assert all(
        "iis_names" not in (f.get("metadata") or {})
        for f in dmeta["schema"]["fields"]
    )
    # widen + drop histories refuse too (the marker-less evolutions the
    # review caught), and compact unblocks them identically
    wd = SnapshotTable(str(tmp_path / "wd"))
    wd.append(spark.createDataFrame([(1, 2.0)], "k int, v double"))
    from pyspark.sql import types as T

    wd.widen_column("k", T.LongType())
    with pytest.raises(ValueError, match="pre-evolution"):
        wd.clone_to(str(tmp_path / "wd2"))
    wd.drop_column("v")
    wd.compact(spark)
    wclone = wd.clone_to(str(tmp_path / "wd2"))
    assert wclone.read(spark).columns == ["k"]  # no resurrection
    assert [r.k for r in wclone.read(spark).collect()] == [1]
    # cloning onto a non-empty target is refused, not silently merged
    with pytest.raises(ValueError, match="not empty"):
        src.clone_to(str(tmp_path / "clone"))


def test_deletion_vector_codec_roundtrip():
    """DV wire form: encode/decode/union/cardinality are exact for
    sparse, dense, singleton, and high-position bitmaps; negative and
    empty inputs refuse."""
    import numpy as np

    from iceberg_insert_spark.sources.snapshots.dv import (
        dv_cardinality,
        dv_encode,
        dv_positions,
        dv_union,
    )

    for pos in (
        [0],
        [7],
        [0, 1, 2, 3],
        [5, 100000],
        list(range(0, 50000, 7)),
        [999999],
    ):
        blob = dv_encode(pos)
        assert dv_positions(blob).tolist() == sorted(set(pos))
        assert dv_cardinality(blob) == len(set(pos))
    # union across different lengths, overlapping and disjoint
    a, b = dv_encode([1, 5, 9]), dv_encode([5, 20000])
    assert dv_positions(dv_union(a, b)).tolist() == [1, 5, 9, 20000]
    assert dv_positions(dv_union(b, a)).tolist() == [1, 5, 9, 20000]
    # duplicates collapse; encode is deterministic
    assert dv_encode([3, 3, 1]) == dv_encode([1, 3])
    with pytest.raises(ValueError):
        dv_encode([])
    with pytest.raises(ValueError):
        dv_encode([-1, 3])
    # compression: a dense 1M-bit vector stays KB-scale
    dense = dv_encode(np.arange(0, 1_000_000, 2))
    assert len(dense) < 20_000


def test_deletion_vectors_supersede_per_file(spark, tmp_path):
    """Iceberg v3's one-live-DV-per-file rule: stacked MoR deletes
    against the same data files leave the NEWEST DV per file carrying
    the UNION of all deletes — read-side delete state is bounded by
    live files, not delete commits — and reads agree with the model
    at every step (including time travel to each intermediate)."""
    import pyarrow.parquet as pq

    from iceberg_insert_spark.sources.snapshots.dv import (
        dv_cardinality,
    )

    tbl = SnapshotTable(str(tmp_path / "t"))
    v1 = tbl.append(
        spark.createDataFrame(
            [(i,) for i in range(100)], "rid long"
        ).coalesce(1)  # ONE data file: positions are file-local
    )
    v2 = tbl.delete_where(spark, "rid % 10 = 3", strategy="mor")
    v3 = tbl.delete_where(spark, "rid % 10 = 7", strategy="mor")
    v4 = tbl.delete_where(spark, "rid < 5", strategy="mor")
    alive = {r.rid for r in tbl.read(spark).collect()}
    assert alive == {
        i for i in range(100) if i % 10 not in (3, 7) and i >= 5
    }
    # time travel sees each intermediate delete state
    assert tbl.read(spark, as_of=v1).count() == 100
    assert {r.rid for r in tbl.read(spark, as_of=v2).collect()} == {
        i for i in range(100) if i % 10 != 3
    }
    assert {r.rid for r in tbl.read(spark, as_of=v3).collect()} == {
        i for i in range(100) if i % 10 not in (3, 7)
    }
    # each DV commit writes the CONSOLIDATED state and the manifest
    # drops superseded generations: delete_files holds exactly ONE dv
    # entry however many deletes stack (bounded metadata), whose
    # coverage list names the touched data file
    dels = tbl._meta(v4)["delete_files"]
    assert [d["kind"] for d in dels] == ["dv"]
    [newest] = dels
    assert newest["seq"] == v4
    t = pq.read_table(os.path.join(tbl.path, newest["path"]))
    assert t.num_rows == 1  # one data file touched -> one DV row
    [blob] = t.column("__iis_dv").to_pylist()
    [card] = t.column("__iis_dcard").to_pylist()
    expect_dead = {
        i for i in range(100) if i % 10 in (3, 7) or i < 5
    }
    assert card == len(expect_dead) == dv_cardinality(blob)
    # superseded DV generations stay reachable only through OLD
    # snapshots: expiring past them reclaims the old DV parquet
    reclaimed = tbl.expire(keep_from=v4)
    assert sum("_deletes" in p for p in reclaimed) == 2  # v2+v3 DVs
    assert {r.rid for r in tbl.read(spark).collect()} == alive
    # compact folds everything into plain data, as before
    vc = tbl.compact(spark)
    assert "delete_files" not in tbl._meta(vc)
    assert {r.rid for r in tbl.read(spark).collect()} == alive


def test_deletion_vectors_scope_per_file(spark, tmp_path):
    """A DV names exactly its own data file: deletes against one file
    never bleed into rows at the same POSITIONS of another file, and
    a MoR update's new-image files (written by the same commit) are
    untouched by that commit's DVs."""
    tbl = SnapshotTable(str(tmp_path / "t"))
    tbl.append(
        spark.createDataFrame(
            [(i, "a") for i in range(10)], "k long, g string"
        )
    )
    tbl.append(
        spark.createDataFrame(
            [(i, "b") for i in range(10)], "k long, g string"
        )
    )
    # kill positions 0-4 of the 'a' file only
    tbl.delete_where(spark, "g = 'a' AND k < 5", strategy="mor")
    got = {(r.k, r.g) for r in tbl.read(spark).collect()}
    assert got == {(i, "a") for i in range(5, 10)} | {
        (i, "b") for i in range(10)
    }
    # MoR update: old images die, new images (same commit) survive
    tbl.update_where(
        spark, "g = 'b' AND k = 0", {"g": "'B'"}, strategy="mor"
    )
    got = {(r.k, r.g) for r in tbl.read(spark).collect()}
    assert (0, "B") in got and (0, "b") not in got
    assert (0, "a") not in got  # earlier delete still applies


def test_hll_codec_accuracy_and_merge():
    """HLL codec: small cardinalities are exact (linear counting),
    large ones land within the p=12 error envelope, merge is the
    lossless union (merge-of-parts == sketch-of-whole, register-wise),
    and the wire form round-trips."""
    from iceberg_insert_spark.sources.snapshots.hll import (
        hll_add_key,
        hll_decode,
        hll_empty,
        hll_encode,
        hll_estimate,
        hll_merge,
    )

    def sketch(keys):
        regs = hll_empty()
        for k in keys:
            hll_add_key(regs, k)
        return bytes(regs)

    small = sketch([b"i:%d" % i for i in range(3)])
    assert hll_estimate(small) == 3
    mid = sketch([b"i:%d" % i for i in range(1000)])
    assert abs(hll_estimate(mid) - 1000) <= 50  # 5%
    big = sketch([b"s:user-%d" % i for i in range(50000)])
    assert abs(hll_estimate(big) - 50000) <= 2500
    # merge == sketch of the union, exactly (register max is lossless)
    a = sketch([b"i:%d" % i for i in range(0, 30000, 2)])
    b = sketch([b"i:%d" % i for i in range(0, 30000, 3)])
    u = sketch(
        sorted(
            {b"i:%d" % i for i in range(0, 30000, 2)}
            | {b"i:%d" % i for i in range(0, 30000, 3)}
        )
    )
    assert hll_merge(a, b) == u
    assert hll_decode(hll_encode(a)) == a
    # duplicates never move the estimate
    assert sketch([b"i:7"] * 1000) == sketch([b"i:7"])


def test_ndv_metadata_estimate_and_guards(spark, tmp_path):
    """ndv(): metadata-merged estimate within 5% of exact on the fast
    path (exact for low cardinality); un-sketched columns, live delete
    files, and renames all fall back to the exact scan; empty/all-NULL
    files stay on the fast path; compaction re-records sketches for
    the rewritten files and the estimate survives (merge-on-compact)."""
    tbl = SnapshotTable(
        str(tmp_path / "t"), ndv_cols=["k", "g"]
    )
    rows = [(i, f"g{i % 7}", float(i)) for i in range(5000)]
    half = len(rows) // 2
    tbl.append(
        spark.createDataFrame(rows[:half], "k long, g string, v double")
    )
    tbl.append(
        spark.createDataFrame(rows[half:], "k long, g string, v double")
    )
    est, meta = tbl.ndv(spark, "g")
    assert meta is True and est == 7  # linear-counting range: exact
    est, meta = tbl.ndv(spark, "k")
    assert meta is True
    assert abs(est - 5000) <= 250
    # un-sketched column: exact via fallback
    assert tbl.ndv(spark, "v") == (5000, False)
    # all-NULL file contributes nothing, stays on the fast path
    tbl.append(
        spark.createDataFrame(
            [(None, None, 1.0)], "k long, g string, v double"
        )
    )
    est, meta = tbl.ndv(spark, "g")
    assert meta is True and est == 7
    # a live DV delete forces the exact path (sketch counts dead rows)
    tbl.delete_where(spark, "k < 2500", strategy="mor")
    est, meta = tbl.ndv(spark, "k")
    assert (est, meta) == (2500, False)
    # compact folds the delete AND re-records sketches: fast path again
    tbl.compact(spark)
    est, meta = tbl.ndv(spark, "k")
    assert meta is True
    assert abs(est - 2500) <= 125
    # rename: sidecars key by write-time names -> exact fallback
    tbl.rename_column("k", "kid")
    est, meta = tbl.ndv(spark, "kid")
    assert (est, meta) == (2500, False)


def test_compute_stats_converges_and_merges(spark, tmp_path):
    """Backfill hygiene (review catches): (a) a narrower-handle backfill
    MERGES into existing sidecar entries — it must never wipe another
    column's recorded stats/sketches; (b) un-stat-able columns record
    explicit markers so re-analysis converges to zero files instead of
    re-reading footers forever; (c) unknown columns refuse cleanly."""
    t = SnapshotTable(
        str(tmp_path / "t"), stats_cols=["a"], ndv_cols=["a"]
    )
    t.append(
        spark.createDataFrame(
            [(i, float(i), True) for i in range(50)],
            "a long, v double, flag boolean",
        ).coalesce(1)
    )
    assert t.min_max(spark, "a") == (0, 49, True)
    # (a) narrower handle backfills column v only: a's stats survive
    narrow = SnapshotTable(str(tmp_path / "t"))
    rep = narrow.compute_stats(stats_cols=["v"], ndv_cols=["v"])
    assert rep["files_analyzed"] == 1
    again = SnapshotTable(
        str(tmp_path / "t"), stats_cols=["a", "v"], ndv_cols=["a", "v"]
    )
    assert again.min_max(spark, "a") == (0, 49, True)  # NOT wiped
    assert again.min_max(spark, "v") == (0.0, 49.0, True)
    est, meta = again.ndv(spark, "a")
    assert meta is True and est == 50
    # (b) boolean columns have no storable footer stat (_stat_value
    # -> None): the marker makes re-analysis a no-op, not a loop
    assert narrow.compute_stats(stats_cols=["flag"]) == {
        "files_analyzed": 1
    }
    assert narrow.compute_stats(stats_cols=["flag"]) == {
        "files_analyzed": 0
    }
    # (c) a typo'd column is a clean refusal, never persisted work
    with pytest.raises(ValueError, match="unknown column"):
        narrow.compute_stats(ndv_cols=["nope"])


def test_plan_files_open_ended_and_in_list(spark, tmp_path):
    """r9 predicate grammar: open-ended ranges (`>` / `<` as
    half-bounded (col, lo, None) / (col, None, hi)) and IN lists prune
    from the same [min, max] stats as BETWEEN, and the read result is
    identical to an unpruned filtered read (residual filters re-apply
    exact semantics, including strict bounds the planner relaxes to
    their inclusive hull)."""
    t = SnapshotTable(str(tmp_path / "t"), stats_cols=["k"])
    # three sorted-disjoint files: [0,99], [100,199], [200,299]
    for lo in (0, 100, 200):
        t.append(
            spark.createDataFrame(
                [(lo + i, float(i)) for i in range(100)],
                "k long, v double",
            ).coalesce(1)
        )
    # k > 250: only the top file
    kept, total = t.plan_files(where=("k", 251, None))
    assert total == 3 and len(kept) == 1
    assert t.read(spark, where=("k", 251, None)).count() == 49
    # k < 100: only the bottom file
    kept, _ = t.plan_files(where=("k", None, 99))
    assert len(kept) == 1
    assert t.read(spark, where=("k", None, 99)).count() == 100
    # IN list spanning two files prunes the third
    kept, _ = t.plan_files(isin=("k", [5, 205]))
    assert len(kept) == 2
    got = {r.k for r in t.read(spark, isin=("k", [5, 205])).collect()}
    assert got == {5, 205}
    # IN values all outside every range: zero files, typed empty read
    kept, _ = t.plan_files(isin=("k", [1000, 2000]))
    assert kept == []
    assert t.read(spark, isin=("k", [1000, 2000])).count() == 0
    # empty / all-NULL IN matches nothing (SQL semantics)
    kept, _ = t.plan_files(isin=("k", [None]))
    assert kept == []
    # files without stats keep conservatively
    t2 = SnapshotTable(str(tmp_path / "t2"))
    t2.append(
        spark.createDataFrame(
            [(1, 1.0)], "k long, v double"
        ).coalesce(1)
    )
    kept, total = t2.plan_files(isin=("k", [99]))
    assert len(kept) == total == 1
    assert t2.read(spark, isin=("k", [99])).count() == 0


def test_plan_files_in_list_bloom_tier(spark, tmp_path):
    """IN pruning composes with per-file blooms on a hash-scattered
    layout where range stats keep everything: a two-value IN keeps
    only the residue-class files those keys occupy."""
    t = SnapshotTable(str(tmp_path / "t"), bloom_cols=["k"])
    for r in range(4):
        t.append(
            spark.createDataFrame(
                [(i, float(i)) for i in range(r, 400, 4)],
                "k long, v double",
            ).coalesce(1)
        )
    kept, total = t.plan_files(isin=("k", [13, 14]))  # classes 1, 2
    assert total == 4 and len(kept) == 2
    got = {r.k for r in t.read(spark, isin=("k", [13, 14])).collect()}
    assert got == {13, 14}


def test_plan_files_any_of_or_tree(spark, tmp_path):
    """OR-tree pruning (any_of): a file is pruned only when EVERY
    branch provably excludes it; the residual OR filter makes pruned
    reads equal unpruned filtered reads; nesting and top-level AND
    compose; malformed branches refuse."""
    t = SnapshotTable(str(tmp_path / "t"), stats_cols=["k"])
    for lo in (0, 100, 200):
        t.append(
            spark.createDataFrame(
                [(lo + i, float(lo + i)) for i in range(100)],
                "k long, v double",
            ).coalesce(1)
        )
    # k < 50 OR k > 250: outer files only, middle pruned
    br = [{"where": ("k", None, 49)}, {"where": ("k", 251, None)}]
    kept, total = t.plan_files(any_of=br)
    assert total == 3 and len(kept) == 2
    assert t.read(spark, any_of=br).count() == 50 + 49
    # eq branch OR (range AND in) branch — mixed tree
    br2 = [
        {"eq": ("k", 5)},
        {"where": ("k", 200, None), "isin": ("k", [205, 299])},
    ]
    kept, _ = t.plan_files(any_of=br2)
    assert len(kept) == 2
    got = {r.k for r in t.read(spark, any_of=br2).collect()}
    assert got == {5, 205, 299}
    # top-level conjunct ANDs with the disjunction: restrict to k<=49
    kept, _ = t.plan_files(where=("k", None, 49), any_of=br2)
    assert len(kept) == 1
    assert t.read(spark, where=("k", None, 49), any_of=br2).count() == 1
    # nested any_of: (k<5) OR ((k>=205 AND k<=205) OR (k>=299))
    br3 = [
        {"where": ("k", None, 4)},
        {
            "any_of": [
                {"where": ("k", 205, 205)},
                {"where": ("k", 299, None)},
            ]
        },
    ]
    kept, _ = t.plan_files(any_of=br3)
    assert len(kept) == 2
    assert t.read(spark, any_of=br3).count() == 5 + 1 + 1
    # every branch excluding everything prunes all files, typed empty
    br4 = [{"eq": ("k", 10_000)}, {"where": ("k", 5_000, 6_000)}]
    kept, _ = t.plan_files(any_of=br4)
    assert kept == []
    assert t.read(spark, any_of=br4).count() == 0
    # a branch with no stats coverage keeps conservatively (v has no
    # stats): the whole disjunction keeps every file, rows re-filter
    br5 = [{"eq": ("k", 10_000)}, {"where": ("v", 0.0, 1.0)}]
    kept, _ = t.plan_files(any_of=br5)
    assert len(kept) == 3
    assert t.read(spark, any_of=br5).count() == 2  # v in {0.0, 1.0}
    # guards: empty list and unknown branch keys refuse loudly
    with pytest.raises(ValueError, match="at least one branch"):
        t.plan_files(any_of=[])
    with pytest.raises(ValueError, match="unknown keys"):
        t.plan_files(any_of=[{"partitions": {"k": 1}}])


def test_plan_topk_prunes_and_stays_exact(spark, tmp_path):
    """plan_topk: bound proved from min/max + footer counts; pruned
    top-k reads equal unpruned ORDER BY ... LIMIT; conservative under
    nulls-unknown, overlap, deletes, and k > provable coverage."""
    t = SnapshotTable(str(tmp_path / "t"), stats_cols=["k"])
    for lo in (0, 100, 200):
        t.append(
            spark.createDataFrame(
                [(lo + i, float(lo + i)) for i in range(100)],
                "k long, v double",
            ).coalesce(1)
        )
    kept, total, bound = t.plan_topk("k", 10, desc=True)
    assert (total, len(kept), bound) == (3, 1, 200)
    got = [r.k for r in t.read_topk(spark, "k", 10).collect()]
    assert got == list(range(299, 289, -1))
    # ascending mirror
    kept, _, bound = t.plan_topk("k", 5, desc=False)
    assert (len(kept), bound) == (1, 99)
    assert [r.k for r in t.read_topk(spark, "k", 5, desc=False).collect()] == [
        0, 1, 2, 3, 4,
    ]
    # k spanning two files keeps two
    kept, _, _ = t.plan_topk("k", 150, desc=True)
    assert len(kept) == 2
    assert t.read_topk(spark, "k", 150).count() == 150
    # k beyond any provable coverage: every file kept, still exact
    kept, _, bound = t.plan_topk("k", 10_000, desc=True)
    assert len(kept) == 3 and bound is None
    assert t.read_topk(spark, "k", 10_000).count() == 300
    # NULL keys never enter the top-k and never break the bound
    t2 = SnapshotTable(str(tmp_path / "n"), stats_cols=["k"])
    t2.append(
        spark.createDataFrame(
            [(None, 0.0)] * 50 + [(i, float(i)) for i in range(100)],
            "k long, v double",
        ).coalesce(1)
    )
    t2.append(
        spark.createDataFrame(
            [(100 + i, float(i)) for i in range(100)],
            "k long, v double",
        ).coalesce(1)
    )
    kept, total, _ = t2.plan_topk("k", 60, desc=True)
    assert (total, len(kept)) == (2, 1)
    got = [r.k for r in t2.read_topk(spark, "k", 60).collect()]
    assert got == list(range(199, 139, -1))  # no NULLs
    # ascending with NULLs in the corpus: NULLS LAST explicitly (bare
    # asc() is NULLS FIRST in Spark — review catch), pruned == unpruned
    kept, _, bound = t2.plan_topk("k", 30, desc=False)
    assert (len(kept), bound) == (1, 99)
    got = [r.k for r in t2.read_topk(spark, "k", 30, desc=False).collect()]
    assert got == list(range(0, 30))  # no NULLs at the front either
    # overlapping ranges: both files can hold top keys -> both kept
    t3 = SnapshotTable(str(tmp_path / "o"), stats_cols=["k"])
    t3.append(
        spark.createDataFrame(
            [(i, 0.0) for i in range(0, 200, 2)], "k long, v double"
        ).coalesce(1)
    )
    t3.append(
        spark.createDataFrame(
            [(i, 0.0) for i in range(1, 200, 2)], "k long, v double"
        ).coalesce(1)
    )
    kept, _, _ = t3.plan_topk("k", 10, desc=True)
    assert len(kept) == 2
    assert [r.k for r in t3.read_topk(spark, "k", 10).collect()] == list(
        range(199, 189, -1)
    )
    # live delete files force the conservative full keep (counts are
    # overcounts) and the MoR read stays exact
    t.delete_where(spark, "k >= 290", strategy="mor")
    kept, _, bound = t.plan_topk("k", 10, desc=True)
    assert len(kept) == 3 and bound is None
    assert [r.k for r in t.read_topk(spark, "k", 10).collect()] == list(
        range(289, 279, -1)
    )
    with pytest.raises(ValueError, match="positive"):
        t.plan_topk("k", 0)


def test_stage_replace_publish_is_idempotent_and_conflict_safe(
    spark, tmp_path
):
    """stage_replace/publish mechanics outside transactions (r9
    verdict #4 plumbing): double publish dedupes on wap_id (one
    replace commit, same version returned); a commit landing between
    stage and publish makes publish raise CommitConflict and commit
    NOTHING; racing a publisher against a direct appender always
    leaves one of the two legal serializations, never a lost update
    or a doubled row."""
    from concurrent.futures import ThreadPoolExecutor

    from iceberg_insert_spark.sources.snapshots.errors import (
        CommitConflict,
    )

    t = SnapshotTable(str(tmp_path / "t"))
    for k in range(3):
        t.append(
            spark.createDataFrame(
                [(k, float(k))], "k long, v double"
            ).coalesce(1)
        )
    base = t._latest_published()
    sv = t.stage_replace(
        t.read(spark).coalesce(1), wap_id="w1", replace_base=base
    )
    # staged: off-main, readable by version
    assert t._latest_published() == base
    assert t.read(spark, as_of=sv).count() == 3
    # double publish -> one replace commit, same version
    with ThreadPoolExecutor(2) as ex:
        got = list(ex.map(lambda _: t.publish("w1"), range(2)))
    assert got[0] == got[1] == t._latest_published()
    assert len(t._manifest(t._latest_published())) == 1
    assert sorted(r.k for r in t.read(spark).collect()) == [0, 1, 2]
    # conflict: stage against the new head, let an append land, publish
    base2 = t._latest_published()
    t.stage_replace(
        t.read(spark).coalesce(1), wap_id="w2", replace_base=base2
    )
    t.append(
        spark.createDataFrame([(9, 9.0)], "k long, v double").coalesce(1)
    )
    head_before = t._latest_published()
    with pytest.raises(CommitConflict, match="re-stage"):
        t.publish("w2")
    assert t._latest_published() == head_before  # nothing committed
    assert sorted(r.k for r in t.read(spark).collect()) == [0, 1, 2, 9]
    # race publish vs direct append from a fresh stage: either legal
    # serialization, never lost/doubled rows
    base3 = t._latest_published()
    t.stage_replace(
        t.read(spark).coalesce(1), wap_id="w3", replace_base=base3
    )

    def _pub():
        try:
            return ("pub", t.publish("w3"))
        except CommitConflict:
            return ("conflict", None)

    def _app():
        return (
            "app",
            t.append(
                spark.createDataFrame(
                    [(77, 7.7)], "k long, v double"
                ).coalesce(1)
            ),
        )

    with ThreadPoolExecutor(2) as ex:
        f1, f2 = ex.submit(_pub), ex.submit(_app)
        res = {f1.result()[0]: f1.result()[1], "app": f2.result()[1]}
    ks = sorted(r.k for r in t.read(spark).collect())
    if "pub" in res:
        # replace won the lock first; append landed on top
        assert ks == [0, 1, 2, 9, 77]
    else:
        # append won; replace conflicted and committed nothing
        assert ks == [0, 1, 2, 9, 77]
        assert t.read(spark).count() == 5
