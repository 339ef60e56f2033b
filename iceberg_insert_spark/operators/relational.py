"""Projections, filters, predicates, CASE/COALESCE (SURVEY.md §2.4).

All plans are declarative DataFrame ops so Catalyst pushes predicates and
column pruning into the parquet scan (verify with .explain: PushedFilters /
ReadSchema). Reference has no query surface at all (the only scan is a
whole-blob read, App.java:185-209); these rows are the [EXT] engine surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ..tables import exact_sum, load_table


@query(
    "q_scan_project",
    oracle="""
    SELECT l_orderkey, l_partkey, l_linenumber, l_quantity, l_extendedprice
    FROM lineitem
    """,
)
def q_scan_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column-pruned projection; scan's ReadSchema must be exactly 5 columns."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey", "l_partkey", "l_linenumber", "l_quantity", "l_extendedprice"
    )


@query(
    "q_filter_pred",
    oracle="""
    SELECT CAST(SUM(CAST(ROUND(l_extendedprice * l_discount * 10000)
                         AS BIGINT)) AS DOUBLE) / 10000.0 AS revenue,
           COUNT(*) AS n_rows
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
      AND l_discount BETWEEN 0.03 AND 0.07
      AND l_quantity < 24
    """,
)
def q_filter_pred(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: range + BETWEEN predicates, pushed to the parquet scan.
    Revenue sum in exact fixed-point at scale 4 (the 2dp*2dp product has
    <= 4 true decimal digits): partition-order-independent, see
    tables.exact_sum."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp_ntz"))
            & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp_ntz"))
            & F.col("l_discount").between(0.03, 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            exact_sum(
                F.col("l_extendedprice") * F.col("l_discount"), 4
            ).alias("revenue"),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )


@query(
    "q_filter_in_like",
    oracle="""
    SELECT p_partkey, p_name, p_brand, p_size
    FROM part
    WHERE (p_brand IN ('Brand#1', 'Brand#7', 'Brand#13') OR p_name LIKE '%red%')
      AND p_type NOT LIKE 'SMALL%'
      AND p_size IS NOT NULL
      AND NOT (p_size = 3)
    """,
)
def q_filter_in_like(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN / LIKE / IS NULL / boolean-op predicates on part."""
    p = load_table(spark, sf_dir, "part")
    return p.filter(
        (
            F.col("p_brand").isin("Brand#1", "Brand#7", "Brand#13")
            | F.col("p_name").like("%red%")
        )
        & ~F.col("p_type").like("SMALL%")
        & F.col("p_size").isNotNull()
        & ~(F.col("p_size") == 3)
    ).select("p_partkey", "p_name", "p_brand", "p_size")


@query(
    "q_case_coalesce",
    oracle="""
    SELECT o_orderkey,
           CASE WHEN o_totalprice > 300000 THEN 'big'
                WHEN o_totalprice > 100000 THEN 'mid'
                ELSE 'small' END AS price_band,
           COALESCE(NULLIF(o_orderstatus, 'O'), 'OPEN') AS status_norm,
           CASE o_orderpriority WHEN '1-URGENT' THEN 1 WHEN '2-HIGH' THEN 2
                ELSE 9 END AS prio_rank
    FROM orders
    """,
)
def q_case_coalesce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CASE WHEN / COALESCE / NULLIF scalar conditionals."""
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.when(F.col("o_totalprice") > 300000, "big")
        .when(F.col("o_totalprice") > 100000, "mid")
        .otherwise("small")
        .alias("price_band"),
        F.coalesce(F.nullif(F.col("o_orderstatus"), F.lit("O")), F.lit("OPEN")).alias(
            "status_norm"
        ),
        F.when(F.col("o_orderpriority") == "1-URGENT", 1)
        .when(F.col("o_orderpriority") == "2-HIGH", 2)
        .otherwise(9)
        .alias("prio_rank"),
    )
