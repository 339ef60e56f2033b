"""Parquet-footer data-skipping introspection (SURVEY.md §2.1 adjunct).

At 100 TB, query cost is mostly "how many files did the predicate let you
NOT read" — Iceberg keeps per-file column bounds in manifests for exactly
this. Plain parquet has the same information in file footers (row-group
column statistics); this module reads it with pyarrow (metadata only, zero
data pages) and scores a range predicate: which files could be skipped
outright, and what fraction of rows a scan must actually touch.

This is the measurement tool behind the layout work (zorder_layout,
partitioned sinks): a layout claim ("sorted layout prunes 8x on custkey")
becomes a checkable number instead of an explain-plan vibe.
"""

from __future__ import annotations

import glob
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ..tables import load_table


def file_skipping_report(
    path: str, column: str, lo, hi
) -> dict[str, int]:
    """Footer-only skipping score for ``lo <= column <= hi`` over every
    parquet file under ``path``.

    A file is skippable iff EVERY row group's [min, max] for the column is
    disjoint from the predicate range — exactly the pruning rule an engine
    (or an Iceberg manifest filter) applies. Returns file and row totals.
    """
    import pyarrow.parquet as pq

    files = sorted(
        glob.glob(os.path.join(path, "**", "*.parquet"), recursive=True)
    )
    n_files = n_skipped = n_rows = n_rows_read = 0
    for f in files:
        md = pq.ParquetFile(f).metadata
        idx = md.schema.to_arrow_schema().get_field_index(column)
        file_rows = md.num_rows
        skippable = True
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(idx).statistics
            if st is None or not st.has_min_max:
                skippable = False
                break
            if not (st.max < lo or st.min > hi):
                skippable = False
                break
        n_files += 1
        n_rows += file_rows
        if skippable:
            n_skipped += 1
        else:
            n_rows_read += file_rows
    return {
        "n_files": n_files,
        "files_skipped": n_skipped,
        "n_rows": n_rows,
        "rows_read": n_rows_read,
    }


# Fixed (non-applicationId-keyed) scratch root: the DuckDB oracle below is a
# STATIC SQL string that must address the same files the query just wrote, so
# the path cannot carry runtime identifiers. The driver and the local gates
# always run query-then-oracle sequentially; two processes racing this one
# query concurrently would clobber each other (same accepted trade as
# SINK_DIR / BUCKETED_TABLE_DIR).
SKIPPING_DIR = "/tmp/iceberg_insert_spark/skipping_oracle"


def _skipping_oracle_block(layout: str) -> str:
    """One layout's footer-scoring block — the EXACT pruning rule
    file_skipping_report applies via pyarrow, re-derived by DuckDB from
    the same parquet footers via parquet_metadata(): a file is skippable
    iff every row group has min/max stats and [min, max] is disjoint from
    the predicate range [lo, hi]."""
    return f"""
    SELECT '{layout}' AS layout,
           COUNT(*) AS n_files,
           CAST(SUM(CASE WHEN skippable THEN 1 ELSE 0 END) AS BIGINT)
               AS files_skipped,
           CAST(SUM(CASE WHEN NOT skippable THEN file_rows ELSE 0 END)
                * 1000000 // GREATEST(SUM(file_rows), 1) AS BIGINT)
               AS read_frac_ppm
    FROM (
        SELECT file_name,
               SUM(row_group_num_rows) AS file_rows,
               BOOL_AND(stats_min_value IS NOT NULL
                        AND stats_max_value IS NOT NULL
                        AND (CAST(stats_max_value AS BIGINT)
                                 < (SELECT lo FROM pred)
                             OR CAST(stats_min_value AS BIGINT)
                                 > (SELECT hi FROM pred))) AS skippable
        FROM parquet_metadata('{SKIPPING_DIR}/{layout}/*.parquet')
        WHERE path_in_schema = 'o_custkey'
        GROUP BY file_name
    )
    """


@query(
    "q_skipping_report",
    oracle=f"""
    WITH dom AS (
        SELECT MIN(o_custkey) AS lo0, MAX(o_custkey) AS hi0 FROM orders
    ), pred AS (
        SELECT lo0 + GREATEST(hi0 - lo0, 1) * 7 // 16 AS lo,
               lo0 + GREATEST(hi0 - lo0, 1) * 8 // 16 AS hi
        FROM dom
    )
    {_skipping_oracle_block("unsorted")}
    UNION ALL
    {_skipping_oracle_block("sorted")}
    """,
)
def q_skipping_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Layout-vs-skipping experiment, quantified from parquet footers: the
    SAME orders data written (a) unsorted and (b) range-sorted on
    o_custkey, each as 8 files; the report scores a narrow custkey range
    predicate against the footers. The sorted layout must let the scan
    skip most files (each file owns a disjoint key range); the unsorted
    layout skips none (every file's [min, max] spans the whole domain).

    DuckDB-oracled (round-5 upgrade from rows-only): the oracle re-scores
    the SAME footers through ``parquet_metadata()`` with the identical
    disjointness rule and the identical integer predicate-bounds
    arithmetic — so pyarrow's footer reading, the file layout the two
    writes produced, and the pruning rule are all independently
    confirmed. File-count/row asymmetry is additionally asserted in
    tests/test_file_stats.py. This is the repo's measurable stand-in for
    Iceberg manifest-level pruning, and the number that justifies
    sort-on-write/zorder at 100 TB.
    """
    import shutil

    from ..tables import require_local_master

    # writes go through Spark, but the footer scoring reads them back with
    # DRIVER-side pyarrow (and the oracle reads the same local path)
    require_local_master(spark, "q_skipping_report's footer scoring")
    base = SKIPPING_DIR
    shutil.rmtree(base, ignore_errors=True)

    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    # (a) arrival order, 8 files (repartition, not coalesce — the source
    # may have fewer input partitions than 8 and coalesce cannot grow)
    o.repartition(8).write.parquet(f"{base}/unsorted")
    # (b) range-sorted on the predicate column, 8 files
    o.repartitionByRange(8, "o_custkey").sortWithinPartitions(
        "o_custkey"
    ).write.parquet(f"{base}/sorted")

    # score a ~1/16th-domain predicate
    stats = o.agg(
        F.min("o_custkey").alias("lo"), F.max("o_custkey").alias("hi")
    ).first()
    span = (stats["hi"] - stats["lo"]) or 1
    lo = stats["lo"] + span * 7 // 16
    hi = stats["lo"] + span * 8 // 16
    rows = []
    for layout in ("unsorted", "sorted"):
        r = file_skipping_report(f"{base}/{layout}", "o_custkey", lo, hi)
        rows.append(
            (
                layout,
                r["n_files"],
                r["files_skipped"],
                r["rows_read"] * 1_000_000 // max(r["n_rows"], 1),
            )
        )
    return spark.createDataFrame(
        rows, "layout string, n_files long, files_skipped long, read_frac_ppm long"
    )
