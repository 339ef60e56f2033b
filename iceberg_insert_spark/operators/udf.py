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
