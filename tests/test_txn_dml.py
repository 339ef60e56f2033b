"""Transactional row-level DML (r10 verdict #3): DELETE/UPDATE stage
their CoW rewrite inside a CatalogTransaction / execute_script BEGIN
block — one visible flip at COMMIT, base validated in the commit CAS,
policy guard at stage time — plus the resolved-plan mask guard
(verdict #7) and the quarantine sweep at catalog open (verdict #5)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from iceberg_insert_spark.sources.catalog import LocalCatalog
from iceberg_insert_spark.sources.snapshots import CommitConflict


def _mk(spark, tmp_path):
    cat = LocalCatalog(str(tmp_path))
    cat.create_namespace("db")
    fact = cat.create_table("db.fact")
    dim = cat.create_table("db.dim")
    fact.append(
        spark.range(0, 40).select(
            F.col("id").alias("k"), (F.col("id") % 4).alias("grp")
        )
    )
    dim.append(
        spark.range(0, 6).select(
            F.col("id").alias("d"), F.lit("old").alias("tag")
        )
    )
    return cat, fact, dim


def test_script_dml_one_visible_flip(spark, tmp_path):
    """BEGIN; DELETE; UPDATE; INSERT; COMMIT — reads inside the
    transaction see the PRE-transaction state (WAP), and everything
    lands as ONE flip: both tables' heads move exactly once from any
    reader's view."""
    cat, fact, dim = _mk(spark, tmp_path)
    res = cat.execute_script(
        spark,
        """
        BEGIN;
        DELETE FROM {{db.fact}} WHERE k % 2 = 0;
        UPDATE {{db.dim}} SET tag = 'new' WHERE d < 2;
        INSERT INTO {{db.fact}} SELECT CAST(900 AS BIGINT) AS k,
                                       CAST(0 AS BIGINT) AS grp;
        SELECT COUNT(*) AS n FROM {{db.fact}};
        COMMIT
        """,
    )
    # the in-transaction read saw the PRE-state (40 rows)
    assert res[4].collect()[0]["n"] == 40
    heads = res[5]
    assert set(heads) == {"db.fact", "db.dim"}
    assert fact.read(spark).count() == 21  # 20 odd + the insert
    assert fact.read(spark).filter(F.col("k") == 900).count() == 1
    assert (
        dim.read(spark).filter(F.col("tag") == "new").count() == 2
    )
    # DML publishes with its real op, so history says what happened
    ops = [
        fact._raw_meta(v).get("op") for v in fact.snapshots()
    ]
    assert "delete" in ops and "stage" in ops


def test_script_dml_abort_invisible(spark, tmp_path):
    """ABORT (or a raising script) leaves NOTHING visible — the r10
    refusal existed exactly because an immediate DELETE escaped the
    abort; the staged form must not."""
    cat, fact, dim = _mk(spark, tmp_path)
    cat.execute_script(
        spark,
        """
        BEGIN;
        DELETE FROM {{db.fact}} WHERE k >= 0;
        UPDATE {{db.dim}} SET tag = 'gone' WHERE d >= 0;
        ABORT
        """,
    )
    assert fact.read(spark).count() == 40
    assert dim.read(spark).filter(F.col("tag") == "gone").count() == 0
    # script ending with an OPEN transaction aborts it and raises
    with pytest.raises(ValueError, match="OPEN transaction"):
        cat.execute_script(
            spark,
            "BEGIN; DELETE FROM {{db.fact}} WHERE k >= 0",
        )
    assert fact.read(spark).count() == 40


def test_txn_dml_conflict_abort_race(spark, tmp_path):
    """A commit landing between stage and COMMIT aborts the WHOLE
    transaction with CommitConflict — nothing visible, the racer's
    rows intact (the verdict's conflict-abort race)."""
    cat, fact, dim = _mk(spark, tmp_path)
    txn = cat.begin_transaction()
    assert txn.delete_where(spark, "db.fact", "k < 10") is not None
    assert (
        txn.update_where(
            spark, "db.dim", "d = 0", {"tag": "'race'"}
        )
        is not None
    )
    # racer commits directly to one replaced table
    fact.append(spark.createDataFrame([(777, 0)], "k long, grp long"))
    with pytest.raises(CommitConflict, match="advanced past"):
        txn.commit()
    # nothing of the transaction visible; racer's row intact
    got = cat.load_table("db.fact").read(spark)
    assert got.count() == 41
    assert got.filter(F.col("k") < 10).count() == 10
    assert (
        cat.load_table("db.dim")
        .read(spark)
        .filter(F.col("tag") == "race")
        .count()
        == 0
    )
    # and the registry carries no txn record (aborted pre-CAS)
    assert "txns" not in cat._read()


def test_txn_dml_crash_heals_atomically(spark, tmp_path):
    """Committer dies after the CAS: the next catalog read rolls BOTH
    DML steps forward — the post-heal state is exactly what the
    immediate verbs would have produced."""
    cat, fact, dim = _mk(spark, tmp_path)
    txn = cat.begin_transaction()
    txn.delete_where(spark, "db.fact", "grp = 3")
    txn.update_where(spark, "db.dim", "d >= 4", {"tag": "'healed'"})
    txn._mark_committed()  # crash before publish
    # staged only: nothing visible through fresh handles yet... but
    # any catalog read heals first, so observe through the catalog
    got = cat.load_table("db.fact").read(spark)
    assert got.filter(F.col("grp") == 3).count() == 0
    assert got.count() == 30
    assert (
        cat.load_table("db.dim")
        .read(spark)
        .filter(F.col("tag") == "healed")
        .count()
        == 2
    )
    assert "txns" not in cat._read()


def test_txn_dml_noop_and_step_rules(spark, tmp_path):
    """A no-match DML stages nothing (None, like the immediate no-op);
    DML after an append on the same table refuses; appends may follow
    a DML step and publish in staging order."""
    cat, fact, dim = _mk(spark, tmp_path)
    txn = cat.begin_transaction()
    assert txn.delete_where(spark, "db.fact", "k > 10000") is None
    # DML first, append after: allowed, statement order preserved —
    # the appended row ESCAPES the earlier delete
    assert txn.delete_where(spark, "db.fact", "k = 0") is not None
    txn.append(
        "db.fact", spark.createDataFrame([(0, 0)], "k long, grp long")
    )
    heads = txn.commit()
    assert set(heads) == {"db.fact"}
    assert (
        cat.load_table("db.fact")
        .read(spark)
        .filter(F.col("k") == 0)
        .count()
        == 1
    )
    # append then DML on one table: refused (reorder hazard)
    txn2 = cat.begin_transaction()
    txn2.append(
        "db.dim", spark.createDataFrame([(9, "x")], "d long, tag string")
    )
    with pytest.raises(ValueError, match="FIRST step"):
        txn2.delete_where(spark, "db.dim", "d = 9")
    txn2.abort()
    # two DML steps on one table: refused (no read-your-own-writes)
    txn3 = cat.begin_transaction()
    txn3.delete_where(spark, "db.dim", "d = 0")
    with pytest.raises(ValueError, match="FIRST step"):
        txn3.update_where(spark, "db.dim", "d = 1", {"tag": "'y'"})
    txn3.abort()


def test_txn_dml_policy_guard_at_stage_time(spark, tmp_path):
    """Row filter conjoins into the staged predicate (hidden rows
    survive a transactional DELETE); a masked-column predicate
    refuses at STAGE time, before anything is staged."""
    cat, fact, dim = _mk(spark, tmp_path)
    cat.set_row_filter("db.fact", "grp <> 0")
    txn = cat.begin_transaction()
    txn.delete_where(spark, "db.fact", "k >= 0")
    txn.commit()
    got = cat.load_table("db.fact").read(spark)
    assert got.count() == 10  # the grp=0 rows the filter hides
    assert got.filter(F.col("grp") != 0).count() == 0
    cat.set_column_mask("db.dim", "tag", "'***'")
    txn2 = cat.begin_transaction()
    with pytest.raises(ValueError, match="masked column"):
        txn2.delete_where(spark, "db.dim", "tag = 'old'")
    with pytest.raises(ValueError, match="masked column"):
        txn2.update_where(
            spark, "db.dim", "d = 0", {"tag": "upper(tag)"}
        )
    assert not txn2._steps  # nothing staged by the refusals
    txn2.abort()


def test_txn_dml_on_mor_table(spark, tmp_path):
    """Staged DML on a table carrying LIVE merge-on-read state: the
    rewrite folds the touched files' pending deletes (same as the
    immediate path) and the untouched files' delete entries carry
    through the publish — the post-commit state equals what the
    immediate verb produces on an identical twin."""
    cat = LocalCatalog(str(tmp_path))
    cat.create_namespace("db")
    a = cat.create_table("db.a")
    b = cat.create_table("db.b")
    rows = [(i, float(i)) for i in range(20)]
    for t in (a, b):
        t.append(
            spark.createDataFrame(rows, "k long, v double").coalesce(2)
        )
        # MoR delete: hide k in {3, 4} via a position-delete commit
        t.delete_where(spark, "k IN (3, 4)", strategy="mor")
    # immediate verb on the twin
    b.update_where(spark, "k < 8", {"v": "v + 100.0"})
    # staged verb through a transaction on a
    txn = cat.begin_transaction()
    txn.update_where(spark, "db.a", "k < 8", {"v": "v + 100.0"})
    txn.commit()
    got_a = sorted(
        (r.k, r.v)
        for r in cat.load_table("db.a").read(spark).collect()
    )
    got_b = sorted((r.k, r.v) for r in b.read(spark).collect())
    assert got_a == got_b
    # the MoR-hidden rows stayed hidden through the staged rewrite
    assert all(k not in (3, 4) for k, _v in got_a)
    assert (0, 100.0) in got_a and (9, 9.0) in got_a


def test_txn_dml_publish_preserves_stats_pruning(spark, tmp_path):
    """After a staged DML publishes, the metadata planner still
    prunes: carried files keep their stats-sidecar entries (same
    paths), and the rewrite's new files got theirs recorded at STAGE
    time — a range predicate disjoint from a file's [min, max] skips
    it, exactly as after the immediate verb."""
    cat = LocalCatalog(str(tmp_path))
    cat.create_namespace("db")
    cat.create_table("db.t", stats_cols=["k"])
    t = cat.load_table("db.t")
    # two files with disjoint k ranges
    t.append(
        spark.createDataFrame(
            [(k, "lo") for k in range(0, 100)], "k long, s string"
        ).coalesce(1)
    )
    t.append(
        spark.createDataFrame(
            [(k, "hi") for k in range(1000, 1100)], "k long, s string"
        ).coalesce(1)
    )
    txn = cat.begin_transaction()
    assert (
        txn.delete_where(spark, "db.t", "k >= 1050") is not None
    )
    txn.commit()
    t2 = cat.load_table("db.t")
    assert t2.read(spark).count() == 150
    # prune to the untouched low file: the rewritten high file's
    # stats (recorded at stage time) prove it disjoint
    kept, total = t2.plan_files(where=("k", 0, 50))
    assert total == 2 and len(kept) == 1
    # and to the rewritten file: the carried low file prunes away
    kept2, _ = t2.plan_files(where=("k", 1000, 1049))
    assert len(kept2) == 1 and kept2 != kept


def test_mask_guard_resolved_not_textual(spark, tmp_path):
    """The r10 verdict #7 pair: a masked column's NAME inside a string
    literal (or shadowed by a lambda variable) no longer false-
    refuses; a real reference — bare or via expression — still
    refuses. Assignment TO a masked column stays allowed."""
    cat = LocalCatalog(str(tmp_path))
    cat.create_namespace("db")
    t = cat.create_table("db.users")
    t.append(
        spark.createDataFrame(
            [(1, "a@x.com", "note about email", ["e"])],
            "id long, email string, note string, tags array<string>",
        )
    )
    cat.set_column_mask("db.users", "email", "'***'")
    # literal-only: the word 'email' appears only inside strings
    n = cat.sql_delete(
        spark, "DELETE FROM {{db.users}} WHERE note = 'email me'"
    )
    assert n is not None
    # lambda variable shadowing: `email` here is the lambda arg of a
    # higher-order function, not the column
    cat.sql_delete(
        spark,
        "DELETE FROM {{db.users}} WHERE exists(tags, "
        "email -> email = 'zzz')",
    )
    # real reference still refuses — predicate...
    with pytest.raises(ValueError, match="masked column"):
        cat.sql_delete(
            spark, "DELETE FROM {{db.users}} WHERE email = 'a@x.com'"
        )
    # ...and SET expression reading the masked column
    with pytest.raises(ValueError, match="masked column"):
        cat.sql_update(
            spark,
            "UPDATE {{db.users}} SET note = upper(email) "
            "WHERE id = 1",
        )
    # pure write INTO the masked column is allowed (reveals nothing)
    cat.sql_update(
        spark,
        "UPDATE {{db.users}} SET email = 'redacted' WHERE id = 1",
    )
    # case-insensitive mask mapping (review catch, r11): a mask
    # registered under a different case than the schema column must
    # still refuse — Spark resolves case-insensitively, so skipping
    # it was a spelling-deep bypass
    cat.drop_column_mask("db.users", "email")
    cat.set_column_mask("db.users", "EMAIL", "'***'")
    with pytest.raises(ValueError, match="masked column"):
        cat.sql_delete(
            spark, "DELETE FROM {{db.users}} WHERE email = 'x'"
        )
    # and the exonerating paths still exonerate under the case skew
    cat.sql_delete(
        spark, "DELETE FROM {{db.users}} WHERE note = 'email me'"
    )
    # non-identifier mask names (review catch, r11): a backticked
    # column can't be tokenized, so it is always probed — a statement
    # reading it refuses, one ignoring it passes
    cat.drop_column_mask("db.users", "EMAIL")
    t2 = cat.create_table("db.odd")
    t2.append(
        spark.createDataFrame(
            [(1, "x")], "id long, `user-email` string"
        )
    )
    cat.set_column_mask("db.odd", "user-email", "'***'")
    with pytest.raises(ValueError, match="masked column"):
        cat.sql_delete(
            spark,
            "DELETE FROM {{db.odd}} WHERE `user-email` = 'x'",
        )
    cat.sql_delete(spark, "DELETE FROM {{db.odd}} WHERE id = 99")


def test_quarantined_txn_surfaces_at_catalog_open(spark, tmp_path):
    """Verdict #5: a crash-quarantined transaction no longer waits for
    an operator to go looking — the next catalog OPEN warns and lists
    it (committed-but-unpublished ones heal on any read already)."""
    cat = LocalCatalog(str(tmp_path))
    cat.create_namespace("db")
    fact = cat.create_table("db.fact")
    fact.append(
        spark.createDataFrame([(0, 0.0)], "k long, v double").coalesce(1)
    )
    txn = cat.begin_transaction()
    txn.compact(spark, "db.fact", target_files=1)
    txn._mark_committed()  # committer crashes here
    # racer slips into the crash window -> heal will quarantine
    fact.append(
        spark.createDataFrame([(7, 7.0)], "k long, v double").coalesce(1)
    )
    cat.load_table("db.fact")  # heal -> quarantine
    assert len(cat.failed_transactions()) == 1
    # a FRESH catalog open (new process/operator) surfaces it
    with pytest.warns(RuntimeWarning, match="quarantined"):
        cat2 = LocalCatalog(str(tmp_path))
    assert set(cat2.quarantined_at_open) == set(
        cat.failed_transactions()
    )
    # clean catalogs warn nothing and carry an empty attribute
    import warnings

    with warnings.catch_warnings():
        warnings.simplefilter("error")
        cat3 = LocalCatalog(str(tmp_path / "fresh"))
    assert cat3.quarantined_at_open == {}
