"""Round-3 TPC-H query shapes (SURVEY.md §2.4b): Q4, Q12, Q16, Q19, Q22.

Together with Q1 (q_agg_groupby), Q3, Q5 (q_join_star), Q6 (q_filter_pred),
Q10, Q13, Q14, Q17 (q_subq_scalar_corr) and Q18 these complete the classic
optimizer-shape catalogue: EXISTS-with-interval decorrelation (Q4),
conditional counting after a fact join (Q12), NOT-IN + grouped distinct
count (Q16), OR-of-ANDs disjunctive join predicates (Q19), and scalar-
subquery + anti-join (Q22).

The driver fixture is TPC-H-ish, not TPC-H: columns the spec uses that the
fixture lacks are substituted with the nearest available signal and the
deviation is documented per query (l_commitdate/l_receiptdate -> late
shipment vs o_orderdate; l_shipmode -> l_returnflag classes; partsupp ->
lineitem (partkey, suppkey) pairs; c_phone country code -> c_custkey % 7).

Determinism: every money aggregate uses ``tables.exact_sum`` (long-cents
accumulation, partition-order-independent); every count is COUNT (BIGINT in
both engines — never SUM(CASE), which DuckDB widens to HUGEINT, the r2
driver-red type trap); the Q22 average-balance threshold is compared in
exact integer cents (a > S/n  ⇔  a·n > S) so no float mean can flip
membership at the boundary.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ..tables import exact_sum, load_table


@query(
    "q_tpch_q4",
    oracle="""
    SELECT o_orderpriority, COUNT(*) AS order_count
    FROM orders o
    WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1997-04-01 00:00:00'
      AND EXISTS (
            SELECT 1 FROM lineitem l
            WHERE l.l_orderkey = o.o_orderkey
              AND l.l_shipdate > o.o_orderdate + INTERVAL 30 DAY)
    GROUP BY o_orderpriority
    """,
)
def q_tpch_q4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape (order priority checking): orders in a quarter with at
    least one late lineitem, counted per priority class.

    Fixture deviation: the spec's l_commitdate < l_receiptdate lateness
    signal doesn't exist here; "late" = shipped more than 30 days after the
    order date (same correlated-interval-predicate shape).

    Scale shape: the EXISTS decorrelates to a left-semi join on orderkey
    with the interval predicate as a join residual — one orderkey shuffle
    of the quarter-pruned orders (the date range pushes to the scan)
    against lineitem; the per-priority count aggregates 5 groups with
    map-side partials.
    """
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1997-04-01").cast("timestamp_ntz"))
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_shipdate"
    )
    cond = (F.col("o_orderkey") == F.col("l_orderkey")) & (
        F.col("l_shipdate")
        > F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS")
    )
    return (
        o.join(li, cond, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


@query(
    "q_tpch_q12",
    oracle="""
    SELECT l_returnflag AS ship_class,
           COUNT(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                      THEN 1 END) AS high_line_count,
           COUNT(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                      THEN 1 END) AS low_line_count
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
      AND l_shipdate >= o_orderdate
    GROUP BY l_returnflag
    """,
)
def q_tpch_q12(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape (shipping-mode priority split): per ship class, how
    many lineitems belong to high- vs low-priority orders.

    Fixture deviation: no l_shipmode column — l_returnflag stands in as the
    ship class; the shape (fact-fact join + residual inequality + grouped
    conditional counts) is intact. Counts use COUNT(CASE ...), which is
    BIGINT in both engines (SUM(CASE) would widen to HUGEINT in DuckDB —
    the r2 type trap).

    Scale shape: the year range on l_shipdate pushes to the lineitem scan
    before the orderkey shuffle; the cross-table l_shipdate >= o_orderdate
    residual evaluates during the join; 2 output groups, map-side partials.
    """
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp_ntz"))
    )
    hi = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .filter(F.col("l_shipdate") >= F.col("o_orderdate"))
        .groupBy(F.col("l_returnflag").alias("ship_class"))
        .agg(
            F.count(F.when(hi, 1)).alias("high_line_count"),
            F.count(F.when(~hi, 1)).alias("low_line_count"),
        )
    )


@query(
    "q_tpch_q16",
    oracle="""
    SELECT p_brand, p_type, p_size,
           COUNT(DISTINCT l_suppkey) AS supplier_cnt
    FROM part JOIN lineitem ON p_partkey = l_partkey
    WHERE p_brand <> 'Brand#1'
      AND p_type NOT LIKE 'PROMO%'
      AND p_size IN (1, 5, 9, 14, 19, 23, 36, 45)
      AND l_suppkey NOT IN
          (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY p_brand, p_type, p_size
    """,
)
def q_tpch_q16(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape (parts/supplier relationship): distinct supplier
    count per surviving (brand, type, size) after excluding a brand, a type
    prefix, and "complaint" suppliers via NOT IN.

    Fixture deviations: no partsupp table — lineitem's (l_partkey,
    l_suppkey) pairs are the association; no supplier comment — negative
    account balance stands in for the complaints filter.

    Scale shape: the excluded-supplier set is dimension-sized -> broadcast
    anti-join (NOT IN over a non-nullable key is exactly anti-join
    semantics); part's attribute filters push to its scan and part
    broadcasts into the fact side; the distinct count shuffles once on the
    (brand, type, size, suppkey) expanded key then collapses — Spark plans
    grouped COUNT(DISTINCT) as a two-level aggregate automatically.
    """
    p = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1")
        & (~F.col("p_type").like("PROMO%"))
        & (F.col("p_size").isin(1, 5, 9, 14, 19, 23, 36, 45))
    )
    bad_s = (
        load_table(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") < 0)
        .select("s_suppkey")
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey"
    )
    return (
        li.join(
            F.broadcast(bad_s),
            F.col("l_suppkey") == F.col("s_suppkey"),
            "left_anti",
        )
        .join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


@query(
    "q_tpch_q19",
    oracle="""
    SELECT CAST(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 10000)
                         AS BIGINT)) AS DOUBLE) / 10000.0 AS revenue,
           COUNT(*) AS n_lines
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
           AND l_quantity BETWEEN 1 AND 11)
       OR (p_brand = 'Brand#5' AND p_size BETWEEN 10 AND 30
           AND l_quantity BETWEEN 10 AND 20)
       OR (p_brand = 'Brand#9' AND p_size BETWEEN 20 AND 50
           AND l_quantity BETWEEN 20 AND 30)
    """,
)
def q_tpch_q19(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape (discounted revenue, OR-of-ANDs): revenue over three
    disjunctive brand/size/quantity bands — the classic disjunctive-
    predicate planning test.

    Fixture deviation: no p_container/l_shipmode/l_shipinstruct — the
    bands use p_size and l_quantity; the optimizer shape (a common
    p_partkey = l_partkey equi-conjunct extractable from every disjunct,
    with the residual OR evaluated post-join) is exactly Q19's.

    Scale shape: naive planning treats the whole WHERE as a join predicate
    and falls to a nested loop; Catalyst extracts the shared equi-key so
    the plan is a broadcast hash join on partkey with the OR as a cheap
    residual filter (asserted no-CartesianProduct by the plan sweep).
    Per-disjunct single-side conjuncts (brand/size on part, quantity on
    lineitem) are OR-able scan prefilters; revenue is exact fixed-point.
    """
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    band = (
        (
            (F.col("p_brand") == "Brand#1")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#5")
            & F.col("p_size").between(10, 30)
            & F.col("l_quantity").between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#9")
            & F.col("p_size").between(20, 50)
            & F.col("l_quantity").between(20, 30)
        )
    )
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .filter(band)
        .agg(
            exact_sum(rev, 4).alias("revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


@query(
    "q_tpch_q22",
    oracle="""
    WITH bal AS (
        SELECT CAST(SUM(CAST(ROUND(c_acctbal * 100) AS BIGINT)) AS BIGINT)
                   AS total_cents,
               COUNT(*) AS n_pos
        FROM customer WHERE c_acctbal > 0.0
    )
    SELECT c_custkey % 7 AS cntry,
           COUNT(*) AS numcust,
           CAST(SUM(CAST(ROUND(c_acctbal * 100) AS BIGINT)) AS DOUBLE)
               / 100.0 AS totacctbal
    FROM customer, bal
    WHERE CAST(ROUND(c_acctbal * 100) AS BIGINT) * n_pos > total_cents
      AND c_custkey NOT IN
          (SELECT o_custkey FROM orders
           WHERE o_orderdate >= TIMESTAMP '2000-01-01 00:00:00')
    GROUP BY 1
    """,
)
def q_tpch_q22(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape (global sales opportunity): customers with no orders
    whose balance beats the positive-balance average, counted per "country".

    Fixture deviations: no c_phone — c_custkey % 7 stands in for the
    country-code band; and because every fixture customer has at least one
    order at sf<=0.01, "no orders" is scoped to "no orders since
    2000-01-01" (lapsed customers) so the anti-join is non-vacuous at
    every scale factor. The shape (uncorrelated scalar aggregate
    threshold + NOT EXISTS anti-join + grouped count/sum) is intact.

    Determinism: "balance > average" is evaluated in exact integer cents —
    a·n > S instead of a > S/n — so no partition-order float mean can flip
    a boundary customer; the output sum is exact fixed-point too.

    Scale shape: the balance aggregate is one tiny row, broadcast back
    (scalar-subquery pattern); the no-orders check is an anti-join on
    custkey (shuffle, but orders projects to the key column only); 7
    output groups with map-side partials.
    """
    c = load_table(spark, sf_dir, "customer")
    cents = F.round(F.col("c_acctbal") * 100).cast("bigint")
    bal = c.filter(F.col("c_acctbal") > 0.0).agg(
        F.sum(cents).alias("total_cents"),
        F.count(F.lit(1)).alias("n_pos"),
    )
    o_keys = (
        load_table(spark, sf_dir, "orders")
        .filter(
            F.col("o_orderdate")
            >= F.lit("2000-01-01").cast("timestamp_ntz")
        )
        .select("o_custkey")
    )
    return (
        c.crossJoin(F.broadcast(bal))
        .filter(cents * F.col("n_pos") > F.col("total_cents"))
        .join(
            o_keys, F.col("c_custkey") == F.col("o_custkey"), "left_anti"
        )
        .groupBy((F.col("c_custkey") % 7).alias("cntry"))
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            exact_sum(F.col("c_acctbal"), 2).alias("totacctbal"),
        )
    )
