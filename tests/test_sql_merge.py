"""SQL front-end MERGE INTO (r11): grammar, clause routing,
first-match-wins, cardinality, governance. The engine underneath is
SnapshotTable.merge_into (tested in test_snapshots); these tests pin
the console verb and its policy behavior."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from iceberg_insert_spark.sources.catalog import LocalCatalog


def _mk(spark, tmp_path):
    cat = LocalCatalog(str(tmp_path))
    cat.create_namespace("m")
    tgt = cat.create_table("m.tgt")
    tgt.append(
        spark.createDataFrame(
            [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0),
             (4, "d", 40.0)],
            "k long, name string, bal double",
        )
    )
    src = cat.create_table("m.src")
    src.append(
        spark.createDataFrame(
            [(2, "B", 200.0), (3, "C", -1.0), (5, "E", 50.0)],
            "k long, name string, bal double",
        )
    )
    return cat, tgt, src


def test_sql_merge_full_clause_set(spark, tmp_path):
    """UPDATE + DELETE + INSERT in one statement, conditions over
    t.*/s.*, one atomic snapshot."""
    cat, tgt, _src = _mk(spark, tmp_path)
    n_before = len(tgt.snapshots())
    cat.execute(
        spark,
        """
        MERGE INTO {{m.tgt}} USING {{m.src}} ON k
        WHEN MATCHED AND s.bal < 0 THEN DELETE
        WHEN MATCHED THEN UPDATE SET name = s.name, bal = s.bal + t.bal
        WHEN NOT MATCHED THEN INSERT
        """,
    )
    got = {
        r.k: (r.name, r.bal)
        for r in cat.load_table("m.tgt").read(spark).collect()
    }
    assert got == {
        1: ("a", 10.0),     # never matched: untouched
        2: ("B", 220.0),    # updated (s.bal + t.bal)
        4: ("d", 40.0),     # never matched: untouched
        5: ("E", 50.0),     # inserted
    }  # 3 deleted (s.bal < 0, first match wins)
    assert len(tgt.snapshots()) == n_before + 1  # ONE snapshot


def test_sql_merge_first_match_wins_and_on_forms(spark, tmp_path):
    """Clause order is SQL's first-match-wins; 'ON t.k = s.k' parses
    to the same key."""
    cat, _tgt, _src = _mk(spark, tmp_path)
    cat.execute(
        spark,
        """
        MERGE INTO {{m.tgt}} USING {{m.src}} ON t.k = s.k
        WHEN MATCHED AND t.k = 2 THEN UPDATE SET name = 'first'
        WHEN MATCHED THEN DELETE
        """,
    )
    got = {
        r.k: r.name
        for r in cat.load_table("m.tgt").read(spark).collect()
    }
    # k=2 hit the UPDATE (first clause), k=3 fell through to DELETE
    assert got == {1: "a", 2: "first", 4: "d"}


def test_sql_merge_grammar_and_cardinality(spark, tmp_path):
    cat, _tgt, src = _mk(spark, tmp_path)
    with pytest.raises(ValueError, match="expected 'MERGE INTO"):
        cat.execute(spark, "MERGE INTO m.tgt USING {{m.src}} ON k "
                           "WHEN MATCHED THEN DELETE")
    with pytest.raises(ValueError, match="unsupported ON"):
        cat.execute(
            spark,
            "MERGE INTO {{m.tgt}} USING {{m.src}} ON t.k = s.j "
            "WHEN MATCHED THEN DELETE",
        )
    with pytest.raises(ValueError, match="NOT MATCHED supports"):
        cat.execute(
            spark,
            "MERGE INTO {{m.tgt}} USING {{m.src}} ON k "
            "WHEN NOT MATCHED THEN UPDATE SET name = 'x'",
        )
    with pytest.raises(ValueError, match="at most one WHEN NOT"):
        cat.execute(
            spark,
            "MERGE INTO {{m.tgt}} USING {{m.src}} ON k "
            "WHEN NOT MATCHED THEN INSERT "
            "WHEN NOT MATCHED AND s.k > 1 THEN INSERT",
        )
    # duplicate source keys + a matched clause = cardinality refusal
    src.append(spark.createDataFrame([(2, "dup", 0.0)],
                                     "k long, name string, bal double"))
    with pytest.raises(ValueError, match="cardinality"):
        cat.execute(
            spark,
            "MERGE INTO {{m.tgt}} USING {{m.src}} ON k "
            "WHEN MATCHED THEN DELETE",
        )


def test_sql_merge_governance(spark, tmp_path):
    """Row filter: hidden target rows survive every clause; NOT
    MATCHED on a filtered target refuses (duplicate-key hazard).
    Masked columns in conditions/assignments refuse by policy."""
    cat, tgt, _src = _mk(spark, tmp_path)
    cat.set_row_filter("m.tgt", "bal < 25.0")  # hides k=3 (30) k=4 (40)
    with pytest.raises(ValueError, match="NOT MATCHED"):
        cat.execute(
            spark,
            "MERGE INTO {{m.tgt}} USING {{m.src}} ON k "
            "WHEN NOT MATCHED THEN INSERT",
        )
    cat.execute(
        spark,
        "MERGE INTO {{m.tgt}} USING {{m.src}} ON k "
        "WHEN MATCHED THEN DELETE",
    )
    got = {r.k for r in tgt.read(spark).collect()}
    # k=2 (visible, matched) deleted; k=3 matched but HIDDEN: survives
    assert got == {1, 3, 4}
    cat.drop_row_filter("m.tgt")
    cat.set_column_mask("m.tgt", "bal", "0.0")
    with pytest.raises(ValueError, match="masked column"):
        cat.execute(
            spark,
            "MERGE INTO {{m.tgt}} USING {{m.src}} ON k "
            "WHEN MATCHED AND t.bal > 5 THEN DELETE",
        )
    with pytest.raises(ValueError, match="masked column"):
        cat.execute(
            spark,
            "MERGE INTO {{m.tgt}} USING {{m.src}} ON k "
            "WHEN MATCHED THEN UPDATE SET name = CAST(t.bal AS STRING)",
        )
    # writing INTO the masked column reveals nothing: allowed
    cat.execute(
        spark,
        "MERGE INTO {{m.tgt}} USING {{m.src}} ON k "
        "WHEN MATCHED AND s.k = 1000 THEN UPDATE SET bal = 0.0",
    )
    # a MASKED merge key refuses outright: the join itself would
    # probe hidden values (matched vs not-matched = existence oracle)
    cat.set_column_mask("m.tgt", "k", "CAST(-1 AS BIGINT)")
    with pytest.raises(ValueError, match="merge key"):
        cat.execute(
            spark,
            "MERGE INTO {{m.tgt}} USING {{m.src}} ON k "
            "WHEN MATCHED THEN DELETE",
        )
    # ...and the refusal is case-insensitive, like Spark's own
    # resolution (review catch: 'ON K' resolved to masked 'k' but
    # bypassed an exact-case guard)
    with pytest.raises(ValueError, match="merge key"):
        cat.execute(
            spark,
            "MERGE INTO {{m.tgt}} USING {{m.src}} ON K "
            "WHEN MATCHED THEN DELETE",
        )


def test_sql_merge_hidden_duplicate_key_refused(spark, tmp_path):
    """Review catch (r11): merge() writes EQUALITY deletes, which
    remove every row holding a key — a filter-hidden row sharing a
    key with a visible matched row would be destroyed. Refused by
    name; disjoint-key merges under the same filter still work."""
    cat = LocalCatalog(str(tmp_path))
    cat.create_namespace("m")
    tgt = cat.create_table("m.tgt")
    # k=2 appears twice: visible (bal 20) and hidden (bal 30)
    tgt.append(
        spark.createDataFrame(
            [(1, "a", 10.0), (2, "b", 20.0), (2, "b2", 30.0)],
            "k long, name string, bal double",
        )
    )
    cat.create_table("m.src").append(
        spark.createDataFrame(
            [(2, "B", 0.0)], "k long, name string, bal double"
        )
    )
    cat.set_row_filter("m.tgt", "bal < 25.0")
    with pytest.raises(ValueError, match="hides"):
        cat.execute(
            spark,
            "MERGE INTO {{m.tgt}} USING {{m.src}} ON k "
            "WHEN MATCHED THEN UPDATE SET name = s.name",
        )
    # nothing was committed by the refusal
    assert cat.load_table("m.tgt").read(spark).count() == 3
    # a merge whose matched keys don't straddle the filter passes
    cat.execute(
        spark,
        "MERGE INTO {{m.tgt}} USING {{m.src}} ON k "
        "WHEN MATCHED AND s.k = 999 THEN DELETE",
    )


def test_sql_merge_grammar_bare_then(spark, tmp_path):
    cat, _tgt, _src = _mk(spark, tmp_path)
    with pytest.raises(ValueError, match="THEN needs an action"):
        cat.execute(
            spark,
            "MERGE INTO {{m.tgt}} USING {{m.src}} ON k "
            "WHEN MATCHED THEN",
        )


def test_sql_merge_view_rules_and_script(spark, tmp_path):
    """Target view refuses; a VIEW as the USING source works (resolved
    through sql(), source policies apply); MERGE inside BEGIN
    refuses."""
    cat, tgt, _src = _mk(spark, tmp_path)
    cat.create_view("m.v_src", "SELECT * FROM {{m.src}} WHERE k <> 3")
    cat.create_view("m.v_tgt", "SELECT * FROM {{m.tgt}}")
    with pytest.raises(ValueError, match="view"):
        cat.execute(
            spark,
            "MERGE INTO {{m.v_tgt}} USING {{m.src}} ON k "
            "WHEN MATCHED THEN DELETE",
        )
    cat.execute(
        spark,
        "MERGE INTO {{m.tgt}} USING {{m.v_src}} ON k "
        "WHEN MATCHED THEN DELETE",
    )
    # the view filtered k=3 out of the source: only k=2 deleted
    assert {r.k for r in tgt.read(spark).collect()} == {1, 3, 4}
    # a string literal containing ' THEN ' must not confuse the
    # clause splitter
    cat.execute(
        spark,
        "MERGE INTO {{m.tgt}} USING {{m.src}} ON k "
        "WHEN MATCHED AND s.name = 'if THEN else' THEN DELETE",
    )


def test_sql_merge_transactional(spark, tmp_path):
    """r11: MERGE stages inside BEGIN — invisible until COMMIT, gone
    on ABORT, equal to the immediate verb's result, and a conflicting
    commit between stage and COMMIT aborts the whole transaction."""
    cat, tgt, _src = _mk(spark, tmp_path)
    # twin for the immediate result
    cat.create_table("m.twin").append(tgt.read(spark))
    cat.execute(
        spark,
        "MERGE INTO {{m.twin}} USING {{m.src}} ON k "
        "WHEN MATCHED AND s.bal < 0 THEN DELETE "
        "WHEN MATCHED THEN UPDATE SET name = s.name "
        "WHEN NOT MATCHED THEN INSERT",
    )
    # ABORT leaves nothing
    cat.execute_script(
        spark,
        "BEGIN; MERGE INTO {{m.tgt}} USING {{m.src}} ON k "
        "WHEN MATCHED THEN DELETE; ABORT",
    )
    assert tgt.read(spark).count() == 4
    # staged + committed == the immediate twin, one visible flip
    res = cat.execute_script(
        spark,
        """
        BEGIN;
        MERGE INTO {{m.tgt}} USING {{m.src}} ON k
            WHEN MATCHED AND s.bal < 0 THEN DELETE
            WHEN MATCHED THEN UPDATE SET name = s.name
            WHEN NOT MATCHED THEN INSERT;
        SELECT COUNT(*) AS n FROM {{m.tgt}};
        COMMIT
        """,
    )
    assert res[2].collect()[0]["n"] == 4  # in-txn read: PRE-state
    got = sorted(
        (r.k, r.name, r.bal)
        for r in cat.load_table("m.tgt").read(spark).collect()
    )
    twin = sorted(
        (r.k, r.name, r.bal)
        for r in cat.load_table("m.twin").read(spark).collect()
    )
    assert got == twin
    # conflict: a commit racing stage->COMMIT aborts the transaction
    txn = cat.begin_transaction()
    src_df = cat.sql(spark, "SELECT * FROM {{m.src}}")
    txn.merge_into(
        spark, "m.tgt", src_df, key="k",
        matched=[("delete", None)],
    )
    cat.load_table("m.tgt").append(
        spark.createDataFrame(
            [(777, "racer", 0.0)], "k long, name string, bal double"
        )
    )
    from iceberg_insert_spark.sources.snapshots import CommitConflict

    with pytest.raises(CommitConflict):
        txn.commit()
    got2 = cat.load_table("m.tgt").read(spark)
    assert got2.filter(F.col("k") == 777).count() == 1  # racer intact
    assert got2.count() == twin.__len__() + 1  # merge not applied


def test_txn_merge_crash_heals_and_cdc_readable(spark, tmp_path):
    """A committed-but-unpublished staged MERGE heals on the next
    catalog read, and the published commit is a well-formed CDC
    source: read_changelog over the flip returns the merge's own
    delete keys + new images (the staged delete entries' sequence
    lands inside the (from, to] range)."""
    from iceberg_insert_spark.sources.snapshots.incremental import (
        read_changelog,
    )

    cat, tgt, _src = _mk(spark, tmp_path)
    from_v = tgt._latest_published()
    txn = cat.begin_transaction()
    src_df = cat.sql(spark, "SELECT * FROM {{m.src}}")
    txn.merge_into(
        spark, "m.tgt", src_df, key="k",
        matched=[("update", None, {"name": "s.name"})],
        not_matched=("insert", None),
    )
    txn._mark_committed()  # crash before publish
    t2 = cat.load_table("m.tgt")  # heal
    assert "txns" not in cat._read()
    to_v = t2._latest_published()
    ch = read_changelog(t2, spark, from_v, to_v)
    by_type = {
        r["_change_type"]: r["n"]
        for r in ch.groupBy("_change_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    # updates k=2,3 -> delete(old)+insert(new); insert k=5 -> insert
    assert by_type == {"delete": 2, "insert": 3}


def test_sql_merge_by_source_full_sync(spark, tmp_path):
    """WHEN NOT MATCHED BY SOURCE (r12, r11 verdict #3): the full-sync
    / SCD-close shape — target rows absent from the source close or
    delete, FIRST-MATCH-WINS among BY SOURCE clauses, all in the same
    ONE atomic snapshot as the matched/not-matched clauses. BY TARGET
    parses as the explicit synonym of plain NOT MATCHED (Spark 4)."""
    cat, tgt, _src = _mk(spark, tmp_path)
    n_before = len(tgt.snapshots())
    cat.execute(
        spark,
        """
        MERGE INTO {{m.tgt}} USING {{m.src}} ON k
        WHEN MATCHED THEN UPDATE SET name = s.name, bal = s.bal
        WHEN NOT MATCHED BY TARGET THEN INSERT
        WHEN NOT MATCHED BY SOURCE AND t.k = 1 THEN DELETE
        WHEN NOT MATCHED BY SOURCE THEN UPDATE SET name = 'closed'
        """,
    )
    got = {
        r.k: (r.name, r.bal)
        for r in cat.load_table("m.tgt").read(spark).collect()
    }
    assert got == {
        # k=1 source-absent, first BY SOURCE clause wins: deleted
        2: ("B", 200.0),      # matched: updated
        3: ("C", -1.0),       # matched: updated
        4: ("closed", 40.0),  # source-absent, catch-all: closed
        5: ("E", 50.0),       # not matched (BY TARGET): inserted
    }
    assert len(tgt.snapshots()) == n_before + 1  # ONE snapshot


def test_sql_merge_by_source_grammar_refusals(spark, tmp_path):
    """BY SOURCE grammar edges: INSERT is meaningless (no source row),
    BY requires NOT, and a row-filtered target refuses the clause
    outright — hidden rows look source-absent, so the clause would
    close the very rows the policy protects (the same governance
    class as the NOT MATCHED insert-duplicate refusal)."""
    cat, _tgt, _src = _mk(spark, tmp_path)
    with pytest.raises(ValueError, match="BY SOURCE supports"):
        cat.execute(
            spark,
            "MERGE INTO {{m.tgt}} USING {{m.src}} ON k "
            "WHEN NOT MATCHED BY SOURCE THEN INSERT",
        )
    with pytest.raises(ValueError, match="requires NOT MATCHED"):
        cat.execute(
            spark,
            "MERGE INTO {{m.tgt}} USING {{m.src}} ON k "
            "WHEN MATCHED BY SOURCE THEN DELETE",
        )
    cat.set_row_filter("m.tgt", "bal < 25.0")
    with pytest.raises(ValueError, match="BY SOURCE"):
        cat.execute(
            spark,
            "MERGE INTO {{m.tgt}} USING {{m.src}} ON k "
            "WHEN NOT MATCHED BY SOURCE THEN DELETE",
        )
    # the refusal committed nothing (raw admin read: all 4 rows)
    assert cat.load_table("m.tgt").read(spark).count() == 4


def test_sql_merge_by_source_transactional(spark, tmp_path):
    """BY SOURCE composes with the staged/transactional path: BEGIN;
    MERGE … BY SOURCE …; COMMIT is one visible flip, and an ABORT
    leaves the target untouched."""
    cat, tgt, _src = _mk(spark, tmp_path)
    res = cat.execute_script(
        spark,
        """
        BEGIN;
        MERGE INTO {{m.tgt}} USING {{m.src}} ON k
          WHEN MATCHED THEN UPDATE SET bal = s.bal
          WHEN NOT MATCHED BY SOURCE THEN UPDATE SET name = 'closed';
        SELECT COUNT(*) AS n FROM {{m.tgt}};
        COMMIT
        """,
    )
    # WAP: the in-transaction read saw the PRE state
    assert res[2].collect()[0]["n"] == 4
    got = {
        r.k: (r.name, r.bal)
        for r in cat.load_table("m.tgt").read(spark).collect()
    }
    assert got == {
        1: ("closed", 10.0),
        2: ("b", 200.0),
        3: ("c", -1.0),
        4: ("closed", 40.0),
    }
    # ABORT path: nothing staged leaks
    cat.execute_script(
        spark,
        """
        BEGIN;
        MERGE INTO {{m.tgt}} USING {{m.src}} ON k
          WHEN NOT MATCHED BY SOURCE THEN DELETE;
        ABORT
        """,
    )
    assert cat.load_table("m.tgt").read(spark).count() == 4


def test_merge_mask_guard_resolved_not_textual(spark, tmp_path):
    """The exact MERGE twin of r11's DML pair (r11 verdict #5 / demerit
    #3): the two-sided t×s probe resolves qualified names, so a masked
    column's NAME inside a SET string literal passes, a genuine
    ``t.``-qualified read still refuses, and an ``s.``-qualified read
    of a SOURCE column merely SHARING the masked name passes (the
    false-refusal class the textual fallback carried)."""
    cat, _tgt, _src = _mk(spark, tmp_path)
    cat.set_column_mask("m.tgt", "bal", "0.0")
    # masked name inside a string literal: passes and commits
    cat.execute(
        spark,
        "MERGE INTO {{m.tgt}} USING {{m.src}} ON k "
        "WHEN MATCHED AND s.k = 2 THEN UPDATE SET name = 'bal audit'",
    )
    got = {
        r.k: r.name
        for r in cat.load_table("m.tgt")
        .read(spark)
        .collect()
    }
    assert got[2] == "bal audit"
    # genuine qualified read of the masked target column: refuses
    with pytest.raises(ValueError, match="masked column"):
        cat.execute(
            spark,
            "MERGE INTO {{m.tgt}} USING {{m.src}} ON k "
            "WHEN MATCHED THEN UPDATE SET name = CAST(t.bal AS STRING)",
        )
    # s.-qualified read of the SOURCE's same-named column: passes
    # (reads source data, reveals nothing the mask hides)
    cat.execute(
        spark,
        "MERGE INTO {{m.tgt}} USING {{m.src}} ON k "
        "WHEN MATCHED AND s.k = 3 THEN UPDATE SET "
        "name = CAST(s.bal AS STRING)",
    )
    got = {
        r.k: r.name
        for r in cat.load_table("m.tgt").read(spark).collect()
    }
    assert got[3] == "-1.0"


def test_merge_by_source_engine_guards(spark, tmp_path):
    """Engine-level BY SOURCE hazards refuse instead of corrupting
    (r12): equality deletes address ROWS BY KEY, so (a) a NULL-key
    row routed to a clause would no-op the delete / duplicate the
    update, and (b) a duplicate key where only SOME sibling rows
    route would destroy the unrouted siblings. A catch-all clause
    (cond None) routes every row and needs no guard."""
    from iceberg_insert_spark.sources.snapshots import SnapshotTable

    t = SnapshotTable(str(tmp_path / "nulls"))
    t.append(
        spark.createDataFrame(
            [(1, "a"), (None, "n")], "k long, s string"
        )
    )
    src = spark.createDataFrame([(1, "x")], "k long, s string")
    with pytest.raises(ValueError, match="NULL-key"):
        t.merge_into(
            spark, src, key="k",
            not_matched_by_source=[("delete", None)],
        )
    # a condition excluding NULL keys makes the same merge legal
    t.merge_into(
        spark, src, key="k",
        not_matched_by_source=[("delete", "t.k IS NOT NULL")],
    )
    assert {(r.k, r.s) for r in t.read(spark).collect()} == {
        (1, "a"), (None, "n")
    }  # k=1 matched (no matched clause), NULL unrouted: both survive

    t2 = SnapshotTable(str(tmp_path / "dups"))
    t2.append(
        spark.createDataFrame(
            [(1, "hit"), (1, "miss"), (2, "z")], "k long, s string"
        )
    )
    src2 = spark.createDataFrame([(2, "x")], "k long, s string")
    with pytest.raises(ValueError, match="source-absent key"):
        t2.merge_into(
            spark, src2, key="k",
            not_matched_by_source=[("delete", "t.s = 'hit'")],
        )
    # same hazard on the MATCHED side (duplicate target keys +
    # all-conditional clauses): refuse
    with pytest.raises(ValueError, match="matched key"):
        t2.merge_into(
            spark,
            spark.createDataFrame([(1, "x")], "k long, s string"),
            key="k",
            matched=[("delete", "t.s = 'hit'")],
        )
    # fully-routed duplicate keys are legal: catch-all deletes both
    t2.merge_into(
        spark, src2, key="k",
        not_matched_by_source=[
            ("delete", "t.s = 'hit'"), ("delete", None),
        ],
    )
    assert {(r.k, r.s) for r in t2.read(spark).collect()} == {(2, "z")}
