"""Batch twins of the streaming window operators (SURVEY.md §2.4 streaming).

The live Structured Streaming versions (readStream + watermark + the same
window functions + checkpointed sink) are in ``streaming/file_stream.py`` and
covered by stream-smoke pytest; these batch twins use the *same* window
expressions on the batch events table so the DuckDB oracle can verify the
window semantics. value sums use exact fixed-point accumulation in both
engines (value is a 2dp double; see tables.exact_sum): long cents sums are
partition-order-independent, so the driver hash cannot diverge with core
count (r01 q_agg_conditional lesson).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import query
from ..tables import exact_sum, load_table
from ..tables import epoch_us

_GAP_US = 30 * 60 * 1_000_000  # 30-minute session gap


@query(
    "q_stream_tumbling",
    oracle="""
    SELECT epoch_us(CAST(date_trunc('hour', ts) AS TIMESTAMP)) AS win_start_us,
           event_type,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS DOUBLE) / 100.0
               AS sum_value
    FROM events
    GROUP BY 1, 2
    """,
)
def q_stream_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour window aggregate (batch twin of the streaming version)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("win"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            exact_sum(F.col("value")).alias("sum_value"),
        )
        .select(
            epoch_us("win.start").alias("win_start_us"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


@query(
    "q_stream_sliding",
    oracle="""
    WITH offsets AS (SELECT UNNEST([0, 1]) AS k)
    SELECT epoch_us(CAST(time_bucket(INTERVAL '30 minutes', ts) AS TIMESTAMP))
               - k * 1800000000 AS win_start_us,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS DOUBLE) / 100.0
               AS sum_value
    FROM events CROSS JOIN offsets
    GROUP BY 1
    """,
)
def q_stream_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding window (1h length, 30m slide): each event lands in 2 windows.

    The oracle reconstructs Spark's window() assignment arithmetically:
    win_start = bucket30m(ts) - k*30m for k in {0,1}.
    """
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour", "30 minutes").alias("win"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            exact_sum(F.col("value")).alias("sum_value"),
        )
        .select(
            epoch_us("win.start").alias("win_start_us"),
            "n_events",
            "sum_value",
        )
    )


@query(
    "q_stream_session",
    oracle=f"""
    WITH flagged AS (
        SELECT user_id, event_id, epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us, value,
               CASE WHEN epoch_us(CAST(ts AS TIMESTAMP))
                         - LAG(epoch_us(CAST(ts AS TIMESTAMP)))
                           OVER (PARTITION BY user_id ORDER BY ts, event_id)
                         >= {_GAP_US}
                    THEN 1 ELSE 0 END AS new_session
        FROM events
    ), numbered AS (
        SELECT *, SUM(new_session) OVER (
                   PARTITION BY user_id ORDER BY ts_us, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_no
        FROM flagged
    )
    SELECT user_id,
           MIN(ts_us) AS session_start_us,
           MAX(ts_us) + {_GAP_US} AS session_end_us,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS DOUBLE) / 100.0
               AS sum_value
    FROM numbered
    GROUP BY user_id, session_no
    """,
)
def q_stream_session(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session window (30-minute gap) per user via session_window(); the oracle
    is the classic gaps-and-islands rewrite (lag + cumulative sum). Spark's
    session end = last event + gap, mirrored in the oracle."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.session_window("ts", "30 minutes").alias("win"), "user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            exact_sum(F.col("value")).alias("sum_value"),
        )
        .select(
            "user_id",
            epoch_us("win.start").alias("session_start_us"),
            epoch_us("win.end").alias("session_end_us"),
            "n_events",
            "sum_value",
        )
    )
