"""Loaders for the driver test tables (TESTDATA.md / FIXTURES.md §A).

All timestamps are canonicalized to TIMESTAMP_NTZ so results are independent
of the session timezone (the DuckDB oracle is timezone-naive too):

  * orders.o_orderdate / lineitem.l_shipdate are parquet timestamp[ms] and read
    natively as TIMESTAMP_NTZ.
  * events.ts is parquet TIMESTAMP(NANOS) which Spark rejects; we read it as
    raw nanos (``spark.sql.legacy.parquet.nanosAsLong``) and rebuild a
    TIMESTAMP_NTZ via integer microsecond arithmetic — verified lossless (the
    generator emits microsecond-precision values; ns residue is 0 across sfs).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import LongType

from .session import apply_runtime_confs

TABLE_NAMES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]

DEFAULT_SF_DIR = "/root/testdata/sf0.001"

_EPOCH_NTZ = "TIMESTAMP_NTZ '1970-01-01 00:00:00'"


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one driver table as a DataFrame with canonical types.

    The unexecuted DataFrame is cached per (session, dir, table): it is an
    immutable plan, and rebuilding it costs a fresh file listing + parquet
    footer read per query construction (~100ms x 96 queries per bench run).
    """
    apply_runtime_confs(spark)
    cache = getattr(spark, "_iis_table_cache", None)
    if cache is None:
        cache = {}
        spark._iis_table_cache = cache
    key = (sf_dir, name)
    if key in cache:
        return cache[key]
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events":
        ts_field = df.schema["ts"].dataType
        if isinstance(ts_field, LongType):
            # nanos -> micros is exact integer arithmetic; DIV avoids the
            # double-precision loss of `/` on ~1.7e18 values.
            df = df.withColumn(
                "ts",
                F.expr(f"timestampadd(MICROSECOND, ts DIV 1000, {_EPOCH_NTZ})"),
            )
    cache[key] = df
    return df


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLE_NAMES}


def epoch_us(col: str) -> F.Column:
    """Epoch microseconds of a TIMESTAMP_NTZ column.

    Timezone-independent; the DuckDB-side twin is ``epoch_us(ts)``.
    """
    return F.expr(f"timestampdiff(MICROSECOND, {_EPOCH_NTZ}, {col})")


def exact_sum(col: F.Column, scale: int = 2) -> F.Column:
    """Partition-order-independent money sum as a double.

    Double addition is not associative — a double sum's last ulp depends on
    partition merge order (the one r01 driver-hash divergence). Accumulating
    per-row fixed-point LONGS is exact and order-independent like DECIMAL,
    but stays in whole-stage codegen on longs (measured 2.2x faster than
    Spark's >18-precision decimal sum, within 17% of a raw double sum).
    Requires values with <= ``scale`` true decimal digits (audited: no
    driver-table value sits on a rounding tie at any SF). The LONG
    accumulator caps group sums at 2^63/10^scale, and ANSI mode turns
    overflow into a runtime error — so the accumulator WIDENS automatically
    when the cap is plausibly reachable (r2 advice): at scale >= 4 (the
    micro-unit spellings used for transcendental sums, cap ~9.2e14) the
    quantized longs accumulate as DECIMAL(38,0), unreachable by any
    physical corpus. At scale <= 3 the cap is >= ~9.2e15 (~$92 quadrillion
    at cents) — beyond any 100 TB fact table — and the long path keeps the
    sum in whole-stage codegen (measured 200M rows local[32]: long 0.61 s,
    decimal(38) 12.2 s, so the wide path is reserved for where it matters).
    Per-row quantization stays on longs either way.

    The DuckDB oracle twin is
    ``CAST(SUM(CAST(ROUND(x * 10^scale) AS BIGINT)) AS DOUBLE) / 10^scale.0``
    — both engines round the identical IEEE product per row (HALF_UP ==
    half-away-from-zero for doubles in both), sum exactly (DuckDB's BIGINT
    sum widens to HUGEINT on its own), and perform the same single double
    division; the accumulator width is invisible in the result.
    """
    factor = 10 ** scale
    quantized = F.round(col * factor).cast("bigint")
    if scale >= 4:
        quantized = quantized.cast("decimal(38,0)")
    return F.sum(quantized).cast("double") / float(factor)


def tiny_df(spark: SparkSession, rows: list, schema) -> DataFrame:
    """Driver-computed result rows as a ONE-slice DataFrame.

    ``spark.createDataFrame(rows, schema)`` parallelizes a local list
    into ``defaultParallelism`` slices — 32 tasks (each with a Python
    worker round-trip) to serve a handful of audit rows, measured
    0.42 s per no-op action on local[32] vs 0.16 s with one slice (r12
    optimization round, guide §6: size output partitions to the data).
    Semantics are unchanged from createDataFrame: same row order, same
    schema application, same null handling — only the slice count
    differs, and these results are a few rows BY CONSTRUCTION (audit
    counters, recall scores), so one slice is the right layout at any
    scale factor."""
    if not rows:
        return spark.createDataFrame([], schema)
    return spark.createDataFrame(
        spark.sparkContext.parallelize(rows, 1), schema
    )


def scratch_dir(spark: SparkSession, sf_dir: str, name: str) -> str:
    """Fresh scratch path for a query that materializes files mid-run,
    keyed by (operator name, Spark applicationId, sf basename): two
    concurrent runs — or distinct sf dirs sharing a basename — get
    disjoint paths instead of clobbering each other's files (round-3
    ADVICE). The previous run's leftovers at the SAME key are removed so
    re-runs within one session stay idempotent."""
    import re
    import shutil

    tag = re.sub(r"\W", "_", sf_dir.rstrip("/").split("/")[-1])
    app = spark.sparkContext.applicationId
    d = f"/tmp/iceberg_insert_spark/{name}/{app}/{tag}"
    shutil.rmtree(d, ignore_errors=True)
    return d


def ranged_offsets(
    df: DataFrame,
    n_partitions: int,
    sort_cols: list,
    weight: str | None = None,
) -> tuple[DataFrame, int]:
    """Two-pass global-order offsets WITHOUT a global sort (the scalable
    zipWithIndex pattern, shared by q_docs_shuffle's positions and
    q_lineitem_pareto's cumulative sums): range-partition on the sort
    key (balanced output partitions), sort within partitions, PIN the
    split (localCheckpoint — repartitionByRange samples boundaries, so
    the offset job and the consumer must see the same split), then join
    each row to its partition's preceding-partitions offset computed
    from an n_partitions-row driver aggregate.

    ``weight=None`` offsets by row COUNT (global positions); a column
    name offsets by its SUM (global cumulative sums). Returns
    ``(df + [_pid, _off] columns, grand_total)``; the caller finishes
    with a per-partition window (row_number / running sum) + ``_off`` —
    parallel windows, no single-partition exchange anywhere.
    """
    spark = df.sparkSession
    ordered = (
        df.repartitionByRange(n_partitions, *sort_cols)
        .sortWithinPartitions(*sort_cols)
        .withColumn("_pid", F.spark_partition_id())
        .localCheckpoint(eager=True)
    )
    agg = F.count(F.lit(1)) if weight is None else F.sum(weight)
    totals = {
        r["_pid"]: r["_w"]
        for r in ordered.groupBy("_pid").agg(agg.alias("_w")).collect()
    }
    offsets, acc = {}, 0
    for pid in sorted(totals):
        offsets[pid] = acc
        acc += totals[pid]
    offset_df = F.broadcast(
        spark.createDataFrame(
            [(pid, off) for pid, off in offsets.items()],
            "_pid int, _off long",
        )
    )
    return ordered.join(offset_df, "_pid"), acc


def require_local_master(spark: SparkSession, what: str) -> None:
    """Driver-local-fixture guard (round-5 review): several queries build
    their input with driver-side ``open()`` or read results with
    driver-side pyarrow — correct in local mode, where driver and
    executors share a filesystem, but invisible to executors on a real
    cluster. Fail loudly with the reason instead of surfacing as a
    confusing executor FileNotFound or a silent 0-row read."""
    master = spark.sparkContext.master
    if not master.startswith("local"):
        raise RuntimeError(
            f"{what} uses a driver-local fixture or driver-side file read; "
            f"on a real cluster (master={master!r}) point it at shared "
            "storage instead of generating the fixture"
        )
