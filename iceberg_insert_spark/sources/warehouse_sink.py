"""Partitioned warehouse sink — Spark-native counterpart of the reference's
Iceberg append path (App.java:100-149).

The reference hand-rolls: group records by partition tuple on the driver
(App.java:100-105), write one parquet per partition (App.java:132-146), then
one Iceberg snapshot commit *per file* (App.java:147-149 — a snapshot
explosion) and deletes the source before committing (App.java:205-207 —
at-most-once). Here:

  * distribution: ``df.repartition(partition_cols)`` replaces the driver-side
    HashMap — the same hash-by-partition-value, executed as one shuffle
    (equivalent to Iceberg ``write.distribution-mode=hash``);
  * layout: ``partitionBy`` writes hive-style ``col=val/`` paths, matching the
    reference's path builder (App.java:112-131);
  * atomicity: one commit per batch, not per file (the parquet writer's
    job-commit protocol locally — the _SUCCESS marker itself is disabled
    session-wide, the manifest-swap tables being the real commit story;
    the real Iceberg catalog commit applies when the runtime jars are on
    the cluster — this container has no Iceberg jars, so the catalog
    itself is exercised only behind ``iceberg_available()``).

Exactly-once upgrade of the reference's delete-before-commit lives in
streaming/file_stream.py (checkpointed Structured Streaming source).
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.partitions import transform_column
from ..registry import query
from ..tables import load_table

SINK_DIR = "/tmp/iceberg_insert_spark/warehouse"


def iceberg_available(spark: SparkSession) -> bool:
    """True if the Iceberg Spark runtime is on the classpath."""
    try:
        spark._jvm.java.lang.Class.forName(  # noqa: SLF001
            "org.apache.iceberg.spark.SparkCatalog"
        )
        return True
    except Exception:
        return False


def avro_available(spark: SparkSession) -> bool:
    """True if the spark-avro module is on the classpath.

    Avro is the one reference-pom format (pom.xml:152-157) not bundled in
    Spark's default distribution — it ships as the external spark-avro
    module. Same gate pattern as ``iceberg_available``: the format
    round-trip test (tests/test_formats.py) runs when the jar is present
    and records the environmental gap when it is not, so parity with the
    reference's format surface is implemented-or-environmental, never
    silently missing.

    The probe is a real 1-row write, not a Class.forName: Spark 4's
    distribution ships some avro CLASSES in the assembly while the data
    source itself stays an external module, so a classpath check
    false-positives — only DataSource resolution tells the truth."""
    import shutil
    import tempfile

    d = tempfile.mkdtemp(prefix="avro_probe_")
    try:
        spark.range(0, 1, 1, 1).write.mode("overwrite").format("avro").save(
            os.path.join(d, "probe")
        )
        return True
    except Exception:
        return False
    finally:
        shutil.rmtree(d, ignore_errors=True)


def append_partitioned(
    df: DataFrame,
    path: str,
    transform: str,
    source_col: str,
    part_col: str = "part",
) -> None:
    """Write ``df`` hive-partitioned by an Iceberg-style transform of
    ``source_col`` (Utile.java semantics via operators.partitions).

    One shuffle on the partition value -> one file per partition per batch
    (vs the reference's one snapshot per partition per source file)."""
    out = df.withColumn(part_col, transform_column(transform, source_col))
    (
        out.repartition(F.col(part_col))
        .write.mode("append")
        .partitionBy(part_col)
        .parquet(path)
    )


@query(
    "q_sink_partitioned",
    oracle="""
    SELECT CAST(DATEDIFF('day', DATE '1970-01-01', CAST(ts AS DATE)) AS BIGINT)
               AS part_day,
           COUNT(*) AS n_rows
    FROM events GROUP BY 1
    """,
)
def q_sink_partitioned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ingestion-parity sink round trip, DuckDB-oracled (round-5 upgrade
    from rows-only): write events day-partitioned, read the files back,
    return per-partition row counts — which must equal the oracle's
    counts computed DIRECTLY from the source table (the q_part_day twin).
    The Spark side's part_day values come from the written hive partition
    DIRECTORIES, so a green hash proves the partition layout the
    reference builds by hand (App.java:112-131) landed every row in the
    right day and lost/duplicated none — a stronger check than reading
    our own files back in both engines, and independent of file layout.
    """
    path = f"{SINK_DIR}/events_by_day"
    if os.path.exists(path):
        shutil.rmtree(path)
    ev = load_table(spark, sf_dir, "events")
    append_partitioned(ev, path, "day", "ts", part_col="part_day")
    back = spark.read.parquet(path)
    return (
        back.groupBy(F.col("part_day").cast("bigint").alias("part_day"))
        .agg(F.count(F.lit(1)).alias("n_rows"))
        .orderBy("part_day")
    )


def compact_partitioned(
    spark: SparkSession,
    path: str,
    target_rows_per_file: int = 1_000_000,
) -> dict[str, int]:
    """Small-file compaction for a hive-partitioned parquet dir — the local
    analogue of Iceberg's ``rewrite_data_files`` procedure (which replaces
    this function verbatim when the runtime jars are present).

    Micro-batch ingest accretes one file per partition per batch (the
    reference is worse: one per partition per SOURCE file, App.java:132-149);
    at 100 TB that debt becomes the scan's seek bill. Rewrite: read the whole
    layout, re-shuffle on (partition, within-partition bucket), write each
    partition as ~ceil(rows/target) files. The bucket count per partition
    comes from a tiny per-partition row-count aggregate (broadcast back onto
    the scan), so an oversized partition IS split into multiple target-size
    files while small partitions stay single-file — hashing on the partition
    column alone would collapse each partition value into one task/file no
    matter its size. Atomicity note: a real lake does this inside a snapshot
    commit; the local parquet sink rewrites to a temp dir and swaps.
    """
    import math

    df = spark.read.parquet(path)
    part_col = next(
        c for c in df.columns if c.startswith("part")
    )  # layout written by append_partitioned
    n_rows = df.count()
    files_before = sum(
        len([f for f in fs if f.endswith(".parquet")])
        for _, _, fs in os.walk(path)
    )
    n_files = max(1, math.ceil(n_rows / target_rows_per_file))
    counts = df.groupBy(part_col).agg(F.count(F.lit(1)).alias("_part_rows"))
    buckets = F.greatest(
        F.ceil(F.col("_part_rows") / F.lit(target_rows_per_file)), F.lit(1)
    )
    tmp = f"{path}__compact_tmp"
    (
        df.join(F.broadcast(counts), part_col)
        .withColumn(
            "_bucket",
            F.pmod(F.hash(F.monotonically_increasing_id()), buckets),
        )
        .repartition(n_files, F.col(part_col), F.col("_bucket"))
        .drop("_part_rows", "_bucket")
        .write.mode("overwrite")
        .partitionBy(part_col)
        .parquet(tmp)
    )
    shutil.rmtree(path)
    os.rename(tmp, path)
    files_after = sum(
        len([f for f in fs if f.endswith(".parquet")])
        for _, _, fs in os.walk(path)
    )
    return {
        "rows": n_rows,
        "files_before": files_before,
        "files_after": files_after,
    }


_SINK_ROUNDTRIP_ORACLE = """
    SELECT o_orderstatus,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS DOUBLE)
               / 100.0 AS sum_price,
           CAST(SUM(o_orderkey) AS BIGINT) AS sum_keys,
           STRFTIME(MIN(o_orderdate), '%Y-%m-%d %H:%M:%S') AS first_ts,
           STRFTIME(MAX(o_orderdate), '%Y-%m-%d %H:%M:%S') AS last_ts,
           COUNT(DISTINCT o_orderpriority) AS n_priorities
    FROM orders
    WHERE o_custkey % 10 <> 0
    GROUP BY o_orderstatus
    """


def _roundtrip_agg(back: DataFrame) -> DataFrame:
    from ..tables import exact_sum

    return (
        back.filter(F.col("o_custkey") % 10 != 0)
        .groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            exact_sum(F.col("o_totalprice"), 2).alias("sum_price"),
            F.sum("o_orderkey").alias("sum_keys"),
            F.date_format(
                F.min("o_orderdate"), "yyyy-MM-dd HH:mm:ss"
            ).alias("first_ts"),
            F.date_format(
                F.max("o_orderdate"), "yyyy-MM-dd HH:mm:ss"
            ).alias("last_ts"),
            F.count_distinct("o_orderpriority").alias("n_priorities"),
        )
    )


@query("q_sink_csv_roundtrip", oracle=_SINK_ROUNDTRIP_ORACLE)
def q_sink_csv_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parquet → CSV sink → schema'd read-back fidelity, DuckDB-oracled
    transitively (the oracle recomputes from the parquet source, so a
    row lost to quoting, a double reformatted lossily, a shifted
    timestamp, or a null/empty-string confusion all hash-mismatch).
    Every exercised type survives the TEXT hop: BIGINT, DOUBLE (Spark
    writes shortest-round-trip representations and parses them back to
    the identical bit pattern), STRING, TIMESTAMP_NTZ via an explicit
    timestampNTZFormat, exactly the landing-zone export a warehouse
    hands to CSV-only consumers.

    Scale shape: the writer shuffles nothing (one file per input
    partition); the read-back is a splittable text scan with the schema
    supplied (no inference pass over 100 TB) and the filter applied
    after the hop so it runs against the CSV reader.
    """
    from ..tables import scratch_dir

    path = scratch_dir(spark, sf_dir, "sink_csv")
    fmt = "yyyy-MM-dd HH:mm:ss.SSSSSS"
    o = load_table(spark, sf_dir, "orders")
    (
        o.write.option("header", "true")
        .option("timestampNTZFormat", fmt)
        .csv(path)
    )
    back = (
        spark.read.schema(o.schema)
        .option("header", "true")
        .option("timestampNTZFormat", fmt)
        .csv(path)
    )
    return _roundtrip_agg(back)


@query("q_sink_jsonl_roundtrip", oracle=_SINK_ROUNDTRIP_ORACLE)
def q_sink_jsonl_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parquet → JSON-lines sink → schema'd read-back fidelity — the
    interchange sibling of q_sink_csv_roundtrip (one JSON object per
    line, the format every downstream tool reads); same transitive
    oracle, same type battery, completing the sink matrix
    (parquet partitioned / ORC / CSV / JSONL).

    Scale shape: identical to the CSV sink — shuffle-free write,
    splittable schema'd read-back, filter evaluated post-hop.
    """
    from ..tables import scratch_dir

    path = scratch_dir(spark, sf_dir, "sink_jsonl")
    fmt = "yyyy-MM-dd HH:mm:ss.SSSSSS"
    o = load_table(spark, sf_dir, "orders")
    o.write.option("timestampNTZFormat", fmt).json(path)
    back = (
        spark.read.schema(o.schema)
        .option("timestampNTZFormat", fmt)
        .json(path)
    )
    return _roundtrip_agg(back)
