"""RENAME/DROP COLUMN on the snapshot table (sources/snapshots.py):
Iceberg's metadata-only column DDL, resolved at read time through the
field NAME HISTORY (``iis_names`` / ``iis_added_v`` in the schema
metadata) — the local stand-in for Iceberg's field IDs. The reference
(App.java) has no DDL at all; parity target is Iceberg's
``ALTER TABLE ... RENAME COLUMN / DROP COLUMN`` semantics:

  * old data files are NEVER rewritten — pre-rename files read under
    the new name with data intact, dropped columns just stop resolving;
  * time travel returns each snapshot's OWN schema;
  * a re-added name is a NEW field: era guards keep old bytes from
    resurfacing under it (the collision field IDs exist to prevent);
  * stats/bloom pruning consults the file-era name, never a same-named
    successor's predicate;
  * WAP publish / branch cherry-pick carry a per-file schema-era
    override (``file_schema_v``) because picked files land at a
    sequence NEWER than main-side evolves between fork and pick.

The DuckDB-oracled round trip is q_snapshot_rename_column in
tests/test_oracle.py; these tests pin the DDL edge cases.
"""

from __future__ import annotations

import shutil
import uuid

import pytest
from pyspark.sql import types as T

from iceberg_insert_spark.sources.snapshots import SnapshotTable

BASE = "/tmp/iceberg_insert_spark/column_ddl_tests"


@pytest.fixture
def tdir():
    p = f"{BASE}/{uuid.uuid4().hex[:12]}"
    yield p
    shutil.rmtree(p, ignore_errors=True)


def _df(spark, rows, schema):
    return spark.createDataFrame(rows, schema).coalesce(1)


def test_rename_old_files_read_under_new_name(spark, tdir):
    t = SnapshotTable(tdir)
    t.append(_df(spark, [(1, "x"), (2, "y")], "a int, b string"))
    t.rename_column("a", "a_id")
    t.append(_df(spark, [(3, "z")], "a_id int, b string"))
    out = t.read(spark).orderBy("a_id")
    assert out.columns == ["a_id", "b"]
    assert [(r.a_id, r.b) for r in out.collect()] == [
        (1, "x"),
        (2, "y"),
        (3, "z"),
    ]


def test_time_travel_returns_each_snapshots_own_schema(spark, tdir):
    t = SnapshotTable(tdir)
    v1 = t.append(_df(spark, [(1, "x")], "a int, b string"))
    t.rename_column("a", "a_id")
    old = t.read(spark, as_of=v1)
    assert old.columns == ["a", "b"]
    assert old.collect()[0].a == 1
    assert t.read(spark).columns == ["a_id", "b"]


def test_rename_chain_resolves_every_era(spark, tdir):
    t = SnapshotTable(tdir)
    t.append(_df(spark, [(1,)], "a int"))
    t.rename_column("a", "b")
    t.append(_df(spark, [(2,)], "b int"))
    t.rename_column("b", "c")
    t.append(_df(spark, [(3,)], "c int"))
    assert [r.c for r in t.read(spark).orderBy("c").collect()] == [1, 2, 3]


def test_append_under_the_old_name_is_refused(spark, tdir):
    t = SnapshotTable(tdir)
    t.append(_df(spark, [(1, "x")], "a int, b string"))
    t.rename_column("a", "a_id")
    with pytest.raises(ValueError, match="absent from the table schema"):
        t.append(_df(spark, [(9, "w")], "a int, b string"))


def test_reused_name_never_resurrects_old_bytes(spark, tdir):
    """rename a->b, then add a NEW column under the freed name 'a':
    old files' physical column 'a' must feed field b only — the new
    'a' reads its default for every pre-add row."""
    t = SnapshotTable(tdir)
    t.append(_df(spark, [(1, "x")], "a int, b_s string"))
    t.rename_column("a", "b")
    t.add_column("a", T.IntegerType(), default=0)
    rows = t.read(spark).collect()
    assert [(r.b, r.a) for r in rows] == [(1, 0)]


def test_drop_then_readd_is_a_fresh_field(spark, tdir):
    t = SnapshotTable(tdir)
    t.append(_df(spark, [(1, "secret")], "id int, note string"))
    t.drop_column("note")
    assert t.read(spark).columns == ["id"]
    t.add_column("note", T.StringType(), default="redacted")
    rows = t.read(spark).collect()
    assert [(r.id, r.note) for r in rows] == [(1, "redacted")]
    t.append(_df(spark, [(2, "fresh")], "id int, note string"))
    got = {(r.id, r.note) for r in t.read(spark).collect()}
    assert got == {(1, "redacted"), (2, "fresh")}


def test_widen_then_rename_compose(spark, tdir):
    t = SnapshotTable(tdir)
    t.append(_df(spark, [(7,)], "n int"))
    t.widen_column("n", T.LongType())
    t.rename_column("n", "n_big")
    t.append(_df(spark, [(2**40,)], "n_big long"))
    out = t.read(spark)
    assert dict(out.dtypes)["n_big"] == "bigint"
    assert sorted(r.n_big for r in out.collect()) == [7, 2**40]


def test_rollback_across_rename_restores_old_schema(spark, tdir):
    t = SnapshotTable(tdir)
    v1 = t.append(_df(spark, [(1,)], "a int"))
    t.rename_column("a", "z")
    t.rollback(v1)
    assert t.read(spark).columns == ["a"]
    t.append(_df(spark, [(2,)], "a int"))
    assert sorted(r.a for r in t.read(spark).collect()) == [1, 2]


def test_ddl_refusals(spark, tdir):
    t = SnapshotTable(tdir)
    t.append(_df(spark, [(1, "x")], "a int, b string"))
    with pytest.raises(ValueError, match="no such column"):
        t.rename_column("nope", "x")
    with pytest.raises(ValueError, match="already exists"):
        t.rename_column("a", "b")
    with pytest.raises(ValueError, match="reserved"):
        t.rename_column("a", "__iis_evil")
    with pytest.raises(ValueError, match="no such column"):
        t.drop_column("nope")
    t.drop_column("b")
    with pytest.raises(ValueError, match="only column"):
        t.drop_column("a")


def test_partition_column_ddl_refused(spark, tdir):
    t = SnapshotTable(tdir, partition_by=["p"])
    t.append(_df(spark, [(1, "x")], "p int, v string"))
    with pytest.raises(ValueError, match="partition column"):
        t.rename_column("p", "pp")
    with pytest.raises(ValueError, match="partition column"):
        t.drop_column("p")


def test_live_delete_key_ddl_refused_until_compact(spark, tdir):
    t = SnapshotTable(tdir)
    t.append(_df(spark, [(1, "x"), (2, "y")], "k int, v string"))
    chg = spark.createDataFrame([(2, "y2", "U")], "k int, v string, _op string")
    t.merge(spark, chg, key="k")
    with pytest.raises(ValueError, match="equality-delete"):
        t.rename_column("k", "kid")
    with pytest.raises(ValueError, match="equality-delete"):
        t.drop_column("k")
    # a NON-key column renames fine over live delete files: the MoR
    # anti-join runs on the untouched key while resolution renames v
    t.rename_column("v", "val")
    got = sorted((r.k, r.val) for r in t.read(spark).collect())
    assert got == [(1, "x"), (2, "y2")]
    # compact folds the delete files; the key is then free to rename
    t.compact(spark)
    t.rename_column("k", "kid")
    got = sorted((r.kid, r.val) for r in t.read(spark).collect())
    assert got == [(1, "x"), (2, "y2")]


def test_pruning_maps_predicate_to_file_era_name(spark, tdir):
    """Stats recorded under the OLD name keep pruning for predicates on
    the NEW name — and never mis-prune."""
    t = SnapshotTable(tdir, stats_cols=["a"])
    t.append(_df(spark, [(i,) for i in range(10)], "a int"))
    t.append(_df(spark, [(i,) for i in range(100, 110)], "a int"))
    t.rename_column("a", "a_id")
    t.append(_df(spark, [(i,) for i in range(200, 210)], "a_id int"))
    # hits only the middle (pre-rename) file
    kept, total = t.plan_files(where=("a_id", 100, 109))
    assert total == 3 and len(kept) == 1
    rows = t.read(spark, where=("a_id", 100, 109)).collect()
    assert sorted(r.a_id for r in rows) == list(range(100, 110))
    # hits only the post-rename file
    kept, _ = t.plan_files(where=("a_id", 205, 205))
    assert len(kept) == 1


def test_pruning_readded_name_decided_by_default(spark, tdir):
    """The wrong-prune trap: probe on a RE-ADDED name must not consult
    the old same-named column's stats. Files predating the add are
    all-default, so the predicate is decided exactly from the default."""
    t = SnapshotTable(tdir, stats_cols=["a"])
    t.append(_df(spark, [(5, "r")], "a int, s string"))
    t.rename_column("a", "b")
    t.add_column("a", T.IntegerType(), default=999)
    t.append(_df(spark, [(7, "n", 5)], "b int, s string, a int"))
    # probe a=5: the OLD file's stats say [5,5] under key 'a', but its
    # rows hold the DEFAULT 999 for the new field -> must prune the old
    # file and keep the new one (whose real a=5 matches)
    kept, total = t.plan_files(where=("a", 5, 5))
    assert total == 2 and len(kept) == 1
    rows = t.read(spark, where=("a", 5, 5)).collect()
    assert [(r.b, r.a) for r in rows] == [(7, 5)]
    # probe a=999 keeps the old (all-default) file
    rows = t.read(spark, where=("a", 999, 999)).collect()
    assert [(r.b, r.a) for r in rows] == [(5, 999)]


def test_wap_publish_across_rename(spark, tdir):
    """Staged files are written under the stage-time schema; an evolve
    between stage and publish must not mis-resolve them (file_schema_v
    override on the picked files)."""
    t = SnapshotTable(tdir)
    t.append(_df(spark, [(1, "x")], "a int, b string"))
    t.stage_append(_df(spark, [(2, "y")], "a int, b string"), wap_id="w1")
    t.rename_column("a", "a_id")
    t.publish("w1")
    got = sorted((r.a_id, r.b) for r in t.read(spark).collect())
    assert got == [(1, "x"), (2, "y")]


def test_cherrypick_across_rename(spark, tdir):
    """A branch commit lands at a sequence NEWER than the main-side
    evolve — without the era override its pre-rename column would
    silently read NULL."""
    t = SnapshotTable(tdir)
    t.append(_df(spark, [(10, "p")], "c int, s string"))
    t.create_branch("dev")
    t.rename_column("c", "cid")
    bv = t.append_to_branch(_df(spark, [(20, "q")], "c int, s string"), "dev")
    t.cherrypick(bv)
    got = sorted((r.cid, r.s) for r in t.read(spark).collect())
    assert got == [(10, "p"), (20, "q")]
    # the override survives later appends (per-file carry)
    t.append(_df(spark, [(30, "r")], "cid int, s string"))
    assert sorted(r.cid for r in t.read(spark).collect()) == [10, 20, 30]


def test_cherrypick_across_add_column(spark, tdir):
    """Same hazard for ADD COLUMN (latent before the era override): the
    picked file lacks the new column yet postdates the evolve by
    sequence — it must resolve to the default, not misread."""
    t = SnapshotTable(tdir)
    t.append(_df(spark, [(1,)], "a int"))
    t.create_branch("dev")
    t.add_column("flag", T.StringType(), default="old")
    bv = t.append_to_branch(_df(spark, [(2,)], "a int"), "dev")
    t.cherrypick(bv)
    got = sorted((r.a, r.flag) for r in t.read(spark).collect())
    assert got == [(1, "old"), (2, "old")]


def test_compact_rewrites_under_current_names(spark, tdir):
    t = SnapshotTable(tdir, stats_cols=["a_id"])
    t.append(_df(spark, [(1, "x")], "a int, b string"))
    t.rename_column("a", "a_id")
    t.append(_df(spark, [(2, "y")], "a_id int, b string"))
    t.compact(spark)
    meta = t._meta(t._latest_published())
    # post-compaction: one era, no overrides, stats under the new name
    assert "file_schema_v" not in meta
    kept, total = t.plan_files(where=("a_id", 2, 2))
    assert total == 1 and len(kept) == 1
    assert sorted(r.a_id for r in t.read(spark).collect()) == [1, 2]


def test_is_null_probe_keeps_era_predating_files(spark, tdir):
    """Review regression: an IS NULL probe matches EVERY row of a file
    that predates a no-default column — the degenerate-range path must
    not prune it."""
    t = SnapshotTable(tdir, stats_cols=["a"])
    t.append(_df(spark, [(1,)], "a int"))
    t.add_column("note", T.StringType())  # no default -> all NULL
    kept, total = t.plan_files(eq=("note", None))
    assert total == 1 and len(kept) == 1
    rows = t.read(spark, eq=("note", None)).collect()
    assert [(r.a, r.note) for r in rows] == [(1, None)]
    # and with a NON-null default the same probe provably prunes
    t2 = SnapshotTable(tdir + "_d", stats_cols=["a"])
    t2.append(_df(spark, [(1,)], "a int"))
    t2.add_column("flag", T.StringType(), default="x")
    kept, total = t2.plan_files(eq=("flag", None))
    assert total == 1 and len(kept) == 0


def test_cross_type_probe_on_era_default_keeps_conservatively(spark, tdir):
    """Review regression: a string probe against an int default must
    keep the file (the residual filter coerces), never false-negative
    via raw Python equality."""
    t = SnapshotTable(tdir, stats_cols=["a"], bloom_cols=["a"])
    t.append(_df(spark, [(1,)], "a int"))
    t.add_column("cnt", T.IntegerType(), default=5)
    kept, _ = t.plan_files(eq=("cnt", "5"))  # cross-type probe
    assert len(kept) == 1  # conservative keep
    kept, _ = t.plan_files(eq=("cnt", 5))
    assert len(kept) == 1  # matching default keeps
    kept, _ = t.plan_files(eq=("cnt", 7))
    assert len(kept) == 0  # provably different default prunes
