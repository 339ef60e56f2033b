"""Vectorized Python UDF surface (SURVEY.md §2.4): Arrow-batched pandas UDFs
and grouped-map applyInPandas. Row-at-a-time Python UDFs are deliberately
absent — they are the slow path (10-100x vs Arrow) and nothing here needs them.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import DoubleType

from ..registry import query
from ..tables import load_table


@pandas_udf(DoubleType())
def _zscore_udf(x: pd.Series, mu: pd.Series, sigma: pd.Series) -> pd.Series:
    """Arrow-batched z-score arithmetic; stats are precomputed Spark-side."""
    return (x - mu) / sigma


@query(
    "q_udf_zscore",
    oracle="""
    SELECT doc_id,
           ROUND((n_chars - AVG(n_chars) OVER ()) / STDDEV_POP(n_chars) OVER (), 6)
               AS zscore
    FROM documents
    """,
)
def q_udf_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global z-score of documents.n_chars via a vectorized pandas UDF.

    Global stats come from a tiny aggregate that AQE broadcast-joins back
    (no driver collect); only the per-row arithmetic crosses into Python,
    in Arrow batches.
    """
    d = load_table(spark, sf_dir, "documents")
    stats = d.agg(
        F.avg("n_chars").alias("mu"),
        F.stddev_pop("n_chars").alias("sigma"),
    )
    return (
        d.crossJoin(F.broadcast(stats))
        .select(
            "doc_id",
            F.round(
                _zscore_udf(
                    F.col("n_chars").cast("double"), F.col("mu"), F.col("sigma")
                ),
                6,
            ).alias("zscore"),
        )
    )


def _lang_stats(pdf: pd.DataFrame) -> pd.DataFrame:
    """Grouped-map: per-language document stats computed in pandas."""
    return pd.DataFrame(
        {
            "lang": [pdf["lang"].iloc[0]],
            "n_docs": [len(pdf)],
            "avg_chars": [round(pdf["n_chars"].mean(), 4)],
            "med_chars": [float(pdf["n_chars"].median())],
            "span_chars": [int(pdf["n_chars"].max() - pdf["n_chars"].min())],
        }
    )


@query(
    "q_udaf_grouped",
    oracle="""
    SELECT lang,
           COUNT(*) AS n_docs,
           ROUND(AVG(n_chars), 4) AS avg_chars,
           MEDIAN(n_chars) AS med_chars,
           MAX(n_chars) - MIN(n_chars) AS span_chars
    FROM documents
    GROUP BY lang
    """,
)
def q_udaf_grouped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """applyInPandas grouped-map aggregation per language.

    Scale note: group cardinality is tiny (5 langs) but per-group data flows
    through executors as Arrow batches, not the driver. For high-cardinality
    keys this shape holds; for skewed keys pre-salt then re-merge.
    """
    d = load_table(spark, sf_dir, "documents")
    out = d.select("lang", "n_chars").groupBy("lang").applyInPandas(
        _lang_stats,
        schema="lang string, n_docs long, avg_chars double, med_chars double, "
        "span_chars long",
    )
    return out


def _make_sentence_udtf():
    """Python UDTF (Spark >= 3.5, exercised here on 4.1): a
    sentence/segment splitter whose ``eval`` YIELDS a variable number
    of rows per input row — the table-function shape ``explode`` can
    only fake when the array is precomputed. Built lazily inside a
    factory so importing this module never requires the UDTF API
    (SURVEY §2.4 deferred it while the floor was Spark < 3.5; the
    deferral expired with pyspark 4.1 in the container)."""
    from pyspark.sql.functions import udtf

    # Whitespace is the EXPLICIT ASCII class [ \t\n\r\f\v] on both
    # engines (review catch: Python strip()/split() are Unicode-wide
    # while DuckDB TRIM strips only spaces and RE2 \s is ASCII — a
    # tab or newline at a segment boundary diverged the oracle).
    @udtf(returnType="seg_id int, sentence string, n_words int")
    class SentenceUDTF:
        def eval(self, text: str):
            import re

            if text is None:
                return
            i = 0
            for raw in re.split(r"[.!?]+[ \t\n\r\f\v]+", text):
                s = raw.strip(" \t\n\r\f\v")
                if not s:
                    continue
                i += 1
                yield i, s, len(
                    [w for w in re.split(r"[ \t\n\r\f\v]+", s) if w]
                )

    return SentenceUDTF


@query(
    "q_udtf_sentences",
    oracle="""
    WITH segs AS (
        SELECT doc_id,
               LIST_FILTER(
                   LIST_TRANSFORM(
                       regexp_split_to_array(
                           text, '[.!?]+[ \\t\\n\\r\\f\\v]+'),
                       x -> TRIM(x, ' ' || CHR(9) || CHR(10) || CHR(13)
                                      || CHR(12) || CHR(11))),
                   x -> x <> '') AS arr
        FROM documents
    ),
    flat AS (
        SELECT doc_id,
               UNNEST(LIST_ZIP(arr, RANGE(1, LENGTH(arr) + 1))) AS z
        FROM segs
    )
    SELECT doc_id,
           CAST(z[2] AS INTEGER) AS seg_id,
           z[1] AS sentence,
           CAST(LENGTH(regexp_split_to_array(
                    z[1], '[ \\t\\n\\r\\f\\v]+')) AS INTEGER)
               AS n_words
    FROM flat
    """,
)
def q_udtf_sentences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF through a LATERAL join (r7 verdict item #4),
    DuckDB-oracled end-to-end: every document's text is split into
    sentence segments by a generator UDTF — one input row yielding N
    output rows with a per-doc ordinal — driven through SQL
    ``LATERAL``, and the (doc_id, seg_id, sentence, n_words) set must
    hash-match DuckDB's unnest-with-ordinality reconstruction of the
    same regex split. This pins the UDTF execution path itself (row
    fan-out, ordinal state per eval, NULL input, empty/whitespace
    segments dropped), not just the splitting arithmetic.

    Scale shape: the UDTF runs inside the scan stage per partition —
    rows fan out executor-side with no shuffle and no driver
    materialization (plan pinned in tests/test_udtf.py); counting
    words re-splits the segment rather than carrying a token array
    across the Python boundary. For pure array fan-out prefer
    ``explode`` (JVM-side, q_explode); a UDTF earns its Python round
    trip when the per-row expansion needs real imperative logic."""
    import re

    tag = re.sub(r"\W", "_", sf_dir.rstrip("/").split("/")[-1])
    view = f"_udtf_docs__{tag}"
    fn = f"iis_sentences__{tag}"
    spark.udtf.register(fn, _make_sentence_udtf())
    load_table(spark, sf_dir, "documents").select(
        "doc_id", "text"
    ).createOrReplaceTempView(view)
    return spark.sql(
        f"""
        SELECT d.doc_id, s.seg_id, s.sentence, s.n_words
        FROM {view} d, LATERAL {fn}(d.text) s
        """
    )
