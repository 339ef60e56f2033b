"""Iceberg v2 row-level deletes — merge-on-read (MoR) semantics on plain
parquet: the FOURTH leg of the repo's Iceberg-metadata reproduction, next
to schema evolution, partition-spec evolution and snapshots/time travel.

The reference can only ever APPEND (App.java:147-149 commits append
snapshots; deleting a row means rewriting the table). Iceberg format v2
adds DELETE FILES, applied at read time ("merge-on-read"):

  * EQUALITY deletes — a file of key values; a data row is deleted when
    its key equals any delete row's key;
  * POSITIONAL deletes — a file of (data_file, row_position) pairs; the
    row at that position in that file is deleted.

A v2 reader merges both against the data scan. In Spark terms that merge
IS two anti-joins, which is exactly how this module spells it — the same
physical plan an Iceberg Spark reader produces for a MoR scan:

  * the equality-delete side is dimension-sized (keys only, never rows)
    -> broadcast anti-join, zero extra shuffle on the fact;
  * the positional side joins on (file, pos) — per-FILE positions, so the
    window that reconstructs positions partitions by file and stays
    parallel (never a global row_number);
  * sequence-number visibility (a delete applies only to data files with
    a lower sequence number) is the one simplification: this fixture has
    a single data sequence, documented here.

At 100 TB this is the write-amplification trade that matters: equality
deletes make a CDC delete O(|delete keys|) at write time and defer the
merge cost to reads; the compaction that folds them back into data files
is ``rewrite_position_delete_files`` / ``rewrite_data_files`` (gated on
Iceberg runtime jars, like warehouse_sink's commit path).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import query
from ..tables import exact_sum, load_table

# deterministic delete sets, derived from the keys both engines see
EQ_DELETE_MOD = 13  # o_orderkey % 13 == 5 -> equality-deleted
POS_DELETE_MOD = 101  # every 101st position in each file -> pos-deleted
N_DATA_FILES = 8  # simulated data-file split: o_orderkey % 8


def apply_row_deletes(
    data: DataFrame,
    eq_deletes: DataFrame,
    pos_deletes: DataFrame,
    key: str,
    file_col: str = "_file",
    pos_col: str = "_pos",
) -> DataFrame:
    """Merge-on-read: ``data`` (carrying its file/position lineage columns)
    minus equality deletes (broadcast anti-join on ``key``) minus
    positional deletes (anti-join on (file, pos))."""
    survived = data.join(F.broadcast(eq_deletes), key, "left_anti")
    return survived.join(
        pos_deletes, [file_col, pos_col], "left_anti"
    ).drop(file_col, pos_col)


@query(
    "q_iceberg_deletes",
    oracle=f"""
    WITH positioned AS (
        SELECT o_orderkey, o_orderstatus, o_totalprice,
               o_orderkey % {N_DATA_FILES} AS _file,
               ROW_NUMBER() OVER (PARTITION BY o_orderkey % {N_DATA_FILES}
                                  ORDER BY o_orderkey) AS _pos
        FROM orders
    ),
    after_eq AS (
        SELECT * FROM positioned
        WHERE o_orderkey % {EQ_DELETE_MOD} <> 5
    ),
    survivors AS (
        SELECT * FROM after_eq
        WHERE NOT EXISTS (
            SELECT 1 FROM positioned p
            WHERE p._pos % {POS_DELETE_MOD} = 0
              AND p._file = after_eq._file AND p._pos = after_eq._pos)
    )
    SELECT o_orderstatus, COUNT(*) AS n_orders,
           CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS DOUBLE)
               / 100.0 AS sum_price
    FROM survivors GROUP BY o_orderstatus
    """,
)
def q_iceberg_deletes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Iceberg v2 merge-on-read: orders scanned THROUGH an equality-delete
    file (keys with o_orderkey % 13 == 5 — a CDC-style key delete) and a
    positional-delete file (every 101st row position of each simulated
    data file), aggregated per status over the survivors.

    The delete files are derived deterministically from the key space so
    the DuckDB twin reconstructs the identical sets; positions are
    per-file row numbers (window PARTITIONED by file — parallel, never a
    global sort; asserted in tests/test_plans.py). The equality side is
    applied as a BROADCAST anti-join: at 100 TB the delete-key file is
    MBs while the fact is TBs, and this plan touches the fact exactly
    once with zero added fact shuffles.
    """
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    w = Window.partitionBy(F.col("o_orderkey") % N_DATA_FILES).orderBy(
        "o_orderkey"
    )
    positioned = o.select(
        "o_orderkey",
        "o_orderstatus",
        "o_totalprice",
        (F.col("o_orderkey") % N_DATA_FILES).alias("_file"),
        F.row_number().over(w).alias("_pos"),
    )
    eq_deletes = (
        positioned.filter(F.col("o_orderkey") % EQ_DELETE_MOD == 5)
        .select("o_orderkey")
    )
    pos_deletes = (
        positioned.filter(F.col("_pos") % POS_DELETE_MOD == 0)
        .select("_file", "_pos")
    )
    return (
        apply_row_deletes(positioned, eq_deletes, pos_deletes, "o_orderkey")
        .groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            exact_sum(F.col("o_totalprice"), 2).alias("sum_price"),
        )
    )
