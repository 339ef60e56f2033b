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
