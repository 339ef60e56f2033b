"""Python UDTF surface (SURVEY §2.4, deferral expired with pyspark 4.1):
q_udtf_sentences drives a generator UDTF through a SQL LATERAL join.
The DuckDB-oracled round trip is the correctness gate; these tests pin
the semantics edges and the PLAN — the UDTF must fan rows out inside
the scan stage, not behind a shuffle or a driver materialization."""

from __future__ import annotations

from iceberg_insert_spark.operators.udf import (
    _make_sentence_udtf,
    q_udtf_sentences,
)

from .conftest import SF_DIR


def test_udtf_semantics_planted(spark):
    """Per-eval ordinal state, NULL input, empty/whitespace segments,
    multi-delimiter runs — on a planted corpus with known answers."""
    fn = _make_sentence_udtf()
    spark.udtf.register("iis_sentences_t", fn)
    spark.createDataFrame(
        [
            (1, "One. Two sentences!  Three?"),
            (2, None),
            (3, ""),
            (4, "No delimiter here"),
            (5, "Trailing stop."),
            (6, "a.  .  b"),  # whitespace-only middle segment drops
            (7, "Tab\tsep. Line\nbreak.\n"),  # ASCII-ws alignment
        ],
        "doc_id long, text string",
    ).createOrReplaceTempView("udtf_docs_t")
    rows = sorted(
        (r.doc_id, r.seg_id, r.sentence, r.n_words)
        for r in spark.sql(
            "SELECT d.doc_id, s.* FROM udtf_docs_t d, "
            "LATERAL iis_sentences_t(d.text) s"
        ).collect()
    )
    assert rows == [
        (1, 1, "One", 1),
        (1, 2, "Two sentences", 2),
        (1, 3, "Three?", 1),
        (4, 1, "No delimiter here", 3),
        (5, 1, "Trailing stop.", 2),
        (6, 1, "a", 1),
        (6, 2, "b", 1),
        # tabs/newlines are word separators AND strippable — the
        # explicit ASCII class both engines share (review catch)
        (7, 1, "Tab\tsep", 2),
        # the final ".\n" IS a delimiter match, so the period is
        # consumed and the trailing empty segment drops
        (7, 2, "Line\nbreak", 2),
    ]


def test_udtf_plan_fans_out_in_scan_stage(spark):
    """Plan pin (r7 verdict #4 'done' criterion): the UDTF evaluates
    executor-side directly over the column-pruned scan — a
    (Batch|Arrow)EvalPythonUDTF node, NO Exchange below it and no
    driver collect anywhere in the operator."""
    df = q_udtf_sentences(spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "EvalPythonUDTF" in plan
    assert "Exchange" not in plan
    # column pruning reached the parquet scan: only the two columns
    # the lateral join needs are read
    assert "ReadSchema: struct<doc_id:bigint,text:string>" in plan
    assert df.limit(5).count() > 0


def test_udtf_profile_polymorphic_analyze(spark):
    """Polymorphic analyze() UDTF (r8 verdict #7): the output schema
    adapts to the TABLE argument's columns (numeric -> min/max/sum
    triples, non-numeric skipped), the UDTF itself demands the
    hash-partitioning, NULLs follow SQL aggregate semantics, and a
    bad key fails at PLAN time with the analyze() error."""
    import pytest

    from iceberg_insert_spark.operators.udf import _make_profile_udtf

    spark.udtf.register("iis_profile_t", _make_profile_udtf())
    spark.createDataFrame(
        [
            ("a", 1, 10.0, "x"),
            ("a", 5, None, "y"),
            ("b", 3, 2.5, None),
        ],
        "g string, k long, v double, s string",
    ).createOrReplaceTempView("prof_t1")
    rows = {
        r.g: r
        for r in spark.sql(
            "SELECT * FROM iis_profile_t(TABLE(prof_t1), 'g')"
        ).collect()
    }
    assert set(rows) == {"a", "b"}
    a = rows["a"]
    # schema adapted: k -> long triple, v -> double triple, s skipped
    assert (a.n_rows, a.min_k, a.max_k, a.sum_k) == (2, 1, 5, 6)
    assert (a.min_v, a.max_v, a.sum_v) == (10.0, 10.0, 10.0)  # NULL skip
    assert "min_s" not in rows["a"].asDict()
    b = rows["b"]
    assert (b.n_rows, b.sum_k, b.sum_v) == (1, 3, 2.5)
    # a DIFFERENT shape gets a DIFFERENT schema from the same UDTF
    spark.createDataFrame(
        [("p", 7), ("p", 9)], "tag string, only_col long"
    ).createOrReplaceTempView("prof_t2")
    r2 = spark.sql(
        "SELECT * FROM iis_profile_t(TABLE(prof_t2), 'tag')"
    ).collect()[0]
    assert sorted(r2.asDict()) == [
        "max_only_col", "min_only_col", "n_rows", "sum_only_col", "tag",
    ]
    assert (r2.tag, r2.sum_only_col) == ("p", 16)
    # bad partition key: analyze() raises at plan time
    with pytest.raises(Exception, match="not a column"):
        spark.sql(
            "SELECT * FROM iis_profile_t(TABLE(prof_t1), 'nope')"
        ).collect()


def test_udtf_profile_plan_pin(spark):
    """Plan pin (r8 verdict #7 'done' criterion): the profile UDTF
    evaluates as BatchEvalPythonUDTF behind EXACTLY the one
    hash-partition exchange its analyze() demanded — no extra
    shuffle, no driver materialization."""
    from iceberg_insert_spark.operators.udf import q_udtf_profile

    df = q_udtf_profile(spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPythonUDTF" in plan
    n_exchanges = plan.count("Exchange")
    assert n_exchanges == 1, plan
    # Spark projects the demanded key as partition_by_0 and hashes it
    assert "hashpartitioning(partition_by_0" in plan, plan
    # and the rows are the per-language profile (5 langs in testdata)
    assert df.count() == 5


def test_udtf_profile_nan_and_collision_edges(spark):
    """Float NaN follows Spark aggregate order (NaN above every
    double: MAX catches it whenever present, MIN ignores it unless
    all-NaN, SUM propagates), tinyint profiles like any integral, and
    a partition key colliding with a generated column name fails at
    plan time."""
    import math

    import pytest

    from iceberg_insert_spark.operators.udf import _make_profile_udtf

    spark.udtf.register("iis_profile_e", _make_profile_udtf())
    nan = float("nan")
    spark.createDataFrame(
        [("a", 2.0), ("a", nan), ("a", 7.0), ("b", nan)],
        "g string, v double",
    ).createOrReplaceTempView("prof_nan")
    rows = {
        r.g: r
        for r in spark.sql(
            "SELECT * FROM iis_profile_e(TABLE(prof_nan), 'g')"
        ).collect()
    }
    # engine parity checked directly against Spark's own aggregates
    ref = {
        r.g: r
        for r in spark.sql(
            "SELECT g, MIN(v) mn, MAX(v) mx, SUM(v) s "
            "FROM prof_nan GROUP BY g"
        ).collect()
    }
    assert rows["a"].min_v == ref["a"].mn == 2.0
    assert math.isnan(rows["a"].max_v) and math.isnan(ref["a"].mx)
    assert math.isnan(rows["a"].sum_v) and math.isnan(ref["a"].s)
    assert math.isnan(rows["b"].min_v) and math.isnan(ref["b"].mn)
    # tinyint counts as numeric
    spark.sql(
        "SELECT 'x' AS g, CAST(3 AS TINYINT) AS t"
    ).createOrReplaceTempView("prof_tiny")
    r = spark.sql(
        "SELECT * FROM iis_profile_e(TABLE(prof_tiny), 'g')"
    ).collect()[0]
    assert (r.min_t, r.max_t, r.sum_t) == (3, 3, 3)
    # key colliding with a generated name refuses at plan time
    spark.createDataFrame(
        [("k", 1)], "n_rows string, x long"
    ).createOrReplaceTempView("prof_bad")
    with pytest.raises(Exception, match="collides"):
        spark.sql(
            "SELECT * FROM iis_profile_e(TABLE(prof_bad), 'n_rows')"
        ).collect()
