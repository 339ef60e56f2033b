"""TPC-H query shapes (SURVEY.md §2.4b): Q4, Q12, Q16, Q19, Q22 (round 3);
Q7, Q8, Q15, Q21 (round 4); Q2, Q9, Q11, Q20 (round 5, via the derived
partsupp view below).

Together with Q1 (q_agg_groupby), Q3, Q5 (q_join_star), Q6 (q_filter_pred),
Q10, Q13, Q14, Q17 (q_subq_scalar_corr) and Q18 these complete the classic
optimizer-shape catalogue: EXISTS-with-interval decorrelation (Q4),
conditional counting after a fact join (Q12), NOT-IN + grouped distinct
count (Q16), OR-of-ANDs disjunctive join predicates (Q19), scalar-
subquery + anti-join (Q22), two-nation flow analysis with a disjunctive
nation-pair predicate (Q7), grouped market-share ratio over an 8-table
snowflake (Q8), view + scalar-max self-reference (Q15), the
multi-EXISTS/NOT-EXISTS self-join decorrelation stress test (Q21),
correlated-MIN decorrelation (Q2), the two-key fact-to-partsupp profit
snowflake (Q9), aggregate-vs-global-scalar HAVING (Q11), and nested
EXISTS-over-derived-aggregate decorrelation (Q20). With those four the
classic suite's feasible shapes are ALL present — the fixture's missing
partsupp is reconstructed as a deterministic derived view both engines
compute identically (see the round-5 note below).

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


@query(
    "q_tpch_q7",
    oracle="""
    SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
           YEAR(l_shipdate) AS l_year,
           CAST(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 10000)
                         AS BIGINT)) AS DOUBLE) / 10000.0 AS revenue,
           COUNT(*) AS n_lines
    FROM lineitem
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN nation n1 ON s_nationkey = n1.n_nationkey
    JOIN orders ON o_orderkey = l_orderkey
    JOIN customer ON c_custkey = o_custkey
    JOIN nation n2 ON c_nationkey = n2.n_nationkey
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
      AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
        OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
    GROUP BY 1, 2, 3
    """,
)
def q_tpch_q7(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape (volume shipping): bilateral trade flow — revenue
    shipped between two nations, in both directions, per year.

    The planner shape is the disjunctive NATION-PAIR predicate over two
    different dimension paths (supplier->nation vs customer->nation): each
    disjunct pins one side, so neither nation filter alone can be pushed
    to a scan — but filtering BOTH nation copies to the two-nation set
    before the fact joins is valid (the residual OR then only picks the
    direction), which is what the implementation does explicitly and the
    spec's IN-pair formulation does implicitly.

    Scale shape: nation copies broadcast into supplier/customer;
    supplier x 2-nation prefilter broadcasts into the date-pruned
    lineitem scan (fact rows drop ~92% before any shuffle at 25 nations);
    the two remaining shuffles are the fact-fact orderkey join and the
    custkey join — both unavoidable, both on AQE-coalesced exchanges.
    Revenue is exact fixed-point (tables.exact_sum) at scale 4.
    """
    na, nb = "NATION_1", "NATION_2"
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp_ntz"))
    )
    pair = [na, nb]
    n1 = (
        load_table(spark, sf_dir, "nation")
        .filter(F.col("n_name").isin(pair))
        .select(
            F.col("n_nationkey").alias("supp_nkey"),
            F.col("n_name").alias("supp_nation"),
        )
    )
    n2 = (
        load_table(spark, sf_dir, "nation")
        .filter(F.col("n_name").isin(pair))
        .select(
            F.col("n_nationkey").alias("cust_nkey"),
            F.col("n_name").alias("cust_nation"),
        )
    )
    s = load_table(spark, sf_dir, "supplier").join(
        F.broadcast(n1), F.col("s_nationkey") == F.col("supp_nkey")
    ).select("s_suppkey", "supp_nation")
    c = load_table(spark, sf_dir, "customer").join(
        F.broadcast(n2), F.col("c_nationkey") == F.col("cust_nkey")
    ).select("c_custkey", "cust_nation")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .filter(
            ((F.col("supp_nation") == na) & (F.col("cust_nation") == nb))
            | ((F.col("supp_nation") == nb) & (F.col("cust_nation") == na))
        )
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("bigint").alias("l_year"),
        )
        .agg(
            exact_sum(rev, 4).alias("revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


@query(
    "q_tpch_q8",
    oracle="""
    WITH flat AS (
        SELECT YEAR(o_orderdate) AS o_year,
               CAST(ROUND(l_extendedprice * (1 - l_discount) * 100)
                    AS BIGINT) AS vol_cents,
               n2.n_name AS supp_nation
        FROM lineitem
        JOIN part ON p_partkey = l_partkey
        JOIN orders ON o_orderkey = l_orderkey
        JOIN customer ON c_custkey = o_custkey
        JOIN nation n1 ON c_nationkey = n1.n_nationkey
        JOIN region ON n1.n_regionkey = r_regionkey
        JOIN supplier ON s_suppkey = l_suppkey
        JOIN nation n2 ON s_nationkey = n2.n_nationkey
        WHERE r_name = 'EUROPE' AND p_type = 'ECONOMY'
          AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
    )
    SELECT o_year,
           CAST(CAST(SUM(CASE WHEN supp_nation = 'NATION_3'
                              THEN vol_cents ELSE 0 END) AS BIGINT)
                AS DOUBLE) / 100.0 AS nation_revenue,
           CAST(CAST(SUM(vol_cents) AS BIGINT) AS DOUBLE) / 100.0
               AS total_revenue,
           CAST(CAST(SUM(CASE WHEN supp_nation = 'NATION_3'
                              THEN vol_cents ELSE 0 END) AS HUGEINT)
                * 1000000
                // CAST(SUM(vol_cents) AS HUGEINT) AS BIGINT)
               AS mkt_share_ppm
    FROM flat GROUP BY o_year
    """,
)
def q_tpch_q8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape (national market share): one nation's share of the
    revenue its suppliers earn inside a target region's market for one
    part type, per order year — the widest snowflake in the suite
    (lineitem + part + orders + customer + nation x2 + region + supplier).

    Fixture deviation: p_type classes stand in for the spec's 150-value
    type strings (same equality filter shape).

    Scale shape: part (1/6 selectivity) broadcasts into the lineitem scan
    FIRST — the only fact-sized reduction available before the orderkey
    shuffle; the customer->nation->region path reduces customers to one
    region (1/5) before the custkey shuffle; supplier/nation broadcast.
    The share is grouped conditional aggregation over ONE pass — never a
    self-join of two per-year aggregates. Determinism: volumes quantize
    to exact cents per row; the ppm ratio is integral division of two
    exact longs (widened before the 1e6 multiply — at 100 TB a year's
    cents sum times 1e6 clears BIGINT, same widening rule as exact_sum's
    scale>=4 path); the revenue outputs are the exact_sum spelling.
    """
    target = "NATION_3"
    p = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_type") == "ECONOMY")
        .select("p_partkey")
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey",
        F.round(
            F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100
        ).cast("bigint").alias("vol_cents"),
    )
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp_ntz"))
    ).select("o_orderkey", "o_custkey", "o_orderdate")
    n1 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("c_nkey"), "n_regionkey"
    )
    r = load_table(spark, sf_dir, "region").filter(
        F.col("r_name") == "EUROPE"
    )
    c = (
        load_table(spark, sf_dir, "customer")
        .join(
            F.broadcast(
                n1.join(r, F.col("n_regionkey") == F.col("r_regionkey"))
            ),
            F.col("c_nationkey") == F.col("c_nkey"),
        )
        .select("c_custkey")
    )
    n2 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("s_nkey"),
        F.col("n_name").alias("supp_nation"),
    )
    s = load_table(spark, sf_dir, "supplier").join(
        F.broadcast(n2), F.col("s_nationkey") == F.col("s_nkey")
    ).select("s_suppkey", "supp_nation")
    nation_cents = F.sum(
        F.when(F.col("supp_nation") == target, F.col("vol_cents")).otherwise(
            F.lit(0)
        )
    )
    return (
        li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy(F.year("o_orderdate").cast("bigint").alias("o_year"))
        .agg(
            (nation_cents.cast("double") / 100.0).alias("nation_revenue"),
            (F.sum("vol_cents").cast("double") / 100.0).alias(
                "total_revenue"
            ),
            F.expr(
                "CAST(SUM(CASE WHEN supp_nation = 'NATION_3'"
                "              THEN vol_cents ELSE 0 END)"
                "     AS DECIMAL(38,0)) * 1000000 div SUM(vol_cents)"
            ).alias("mkt_share_ppm"),
        )
    )


@query(
    "q_tpch_q15",
    oracle="""
    WITH revenue AS (
        SELECT l_suppkey AS supplier_no,
               CAST(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 100)
                             AS BIGINT)) AS BIGINT) AS total_cents
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
        GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name,
           CAST(total_cents AS DOUBLE) / 100.0 AS total_revenue
    FROM supplier JOIN revenue ON s_suppkey = supplier_no
    WHERE total_cents = (SELECT MAX(total_cents) FROM revenue)
    """,
)
def q_tpch_q15(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape (top supplier): the quarter's revenue-per-supplier
    "view", then the supplier(s) achieving its maximum — the classic
    aggregate-then-scalar-max self-reference.

    Determinism: the spec acknowledges the tie hazard on max(revenue);
    comparing EXACT integer cents makes membership at the max boundary
    bit-stable (a float sum could rank two suppliers differently per
    partition order), and ties — if the data had them — surface as
    multiple rows identically in both engines.

    Scale shape: one suppkey shuffle builds the per-supplier aggregate
    (map-side partials over the date-pruned scan); the max is a 1-row
    broadcast back onto that same aggregate — the view is NOT recomputed
    (the spec's CREATE VIEW + two references would scan lineitem twice if
    taken literally); supplier is a broadcast dimension.
    """
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp_ntz"))
    )
    cents = F.round(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100
    ).cast("bigint")
    # materialized once: the view feeds BOTH the scalar max and the final
    # filter — without this, Spark recompiles the subtree per consumer and
    # scans the fact twice (round-5 scan audit; no ReusedExchange under AQE)
    rev = (
        li.groupBy("l_suppkey")
        .agg(F.sum(cents).alias("total_cents"))
        .localCheckpoint(eager=True)
    )
    mx = rev.agg(F.max("total_cents").alias("max_cents"))
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        rev.crossJoin(F.broadcast(mx))
        .filter(F.col("total_cents") == F.col("max_cents"))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .select(
            "s_suppkey",
            "s_name",
            (F.col("total_cents").cast("double") / 100.0).alias(
                "total_revenue"
            ),
        )
    )


@query(
    "q_tpch_q21",
    oracle="""
    WITH late AS (
        SELECT l_orderkey, l_suppkey
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        WHERE o_orderstatus = 'F'
          AND l_shipdate > o_orderdate + INTERVAL 60 DAY
    )
    SELECT s_name, COUNT(*) AS numwait
    FROM late l1
    JOIN supplier ON s_suppkey = l1.l_suppkey
    JOIN nation ON s_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    WHERE r_name = 'EUROPE'
      AND EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM late l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey)
    GROUP BY s_name
    """,
)
def q_tpch_q21(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape (suppliers who kept orders waiting): per supplier in
    a region, how many finished-order lineitems it shipped late where it
    was the ONLY late supplier on a multi-supplier order — the canonical
    multi-EXISTS + NOT-EXISTS decorrelation stress test.

    Fixture deviations: no l_commitdate/l_receiptdate — "late" is shipped
    >60 days after the order date (the same derived-relation shape); the
    spec's single-nation filter widens to a region (25 fixture nations
    would leave ~4 suppliers).

    Scale shape: both correlated subqueries decorrelate to orderkey-keyed
    self-joins on lineitem — EXISTS becomes a LEFT SEMI join with the
    suppkey-inequality residual, NOT EXISTS a LEFT ANTI join against the
    late subset. All three legs (l1, l2, l3) shuffle on the SAME orderkey,
    so the exchange is reused across the two joins rather than paid three
    times; the status filter prunes orders before the fact join and the
    region-filtered supplier set broadcasts. A naive per-row rewrite would
    be two correlated O(n) probes per lineitem — the decorrelated plan is
    two hash joins.
    """
    o = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "F")
        .select("o_orderkey", "o_orderdate")
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    late = (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .filter(
            F.col("l_shipdate")
            > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
        )
        .select("l_orderkey", "l_suppkey")
    )
    n = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_regionkey"
    )
    r = load_table(spark, sf_dir, "region").filter(
        F.col("r_name") == "EUROPE"
    )
    s_reg = (
        load_table(spark, sf_dir, "supplier")
        .join(
            F.broadcast(n.join(r, F.col("n_regionkey") == F.col("r_regionkey"))),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey", "s_name")
    )
    l1 = late.join(
        F.broadcast(s_reg), F.col("l_suppkey") == F.col("s_suppkey")
    )
    l2 = li.select(
        F.col("l_orderkey").alias("k2"), F.col("l_suppkey").alias("s2")
    )
    l3 = late.select(
        F.col("l_orderkey").alias("k3"), F.col("l_suppkey").alias("s3")
    )
    return (
        l1.join(
            l2,
            (F.col("l_orderkey") == F.col("k2"))
            & (F.col("l_suppkey") != F.col("s2")),
            "left_semi",
        )
        .join(
            l3,
            (F.col("l_orderkey") == F.col("k3"))
            & (F.col("l_suppkey") != F.col("s3")),
            "left_anti",
        )
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
    )


# ---------------------------------------------------------------------------
# Derived partsupp (round 5): the fixture has no partsupp table, which
# blocked Q2/Q9/Q11/Q20. Both engines DERIVE the identical table from the
# parquet they both read — every column a pure integer function of
# (p_partkey, ps_suppkey), so the view is deterministic, engine-portable,
# and scale-free (TPC-H's own partsupp is generated this way: 4 suppliers
# per part via modular arithmetic, dbgen PS_SUPS_PER_PART):
#
#   for i in 0..3:
#     ps_suppkey      = (p_partkey*7 + i*13) mod S          (S = |supplier|)
#     ps_availqty     = (p_partkey*31 + ps_suppkey*17) mod 9999 + 1
#     ps_supplycost_c = (p_partkey*131 + ps_suppkey*29) mod 99900 + 100
#
# supplycost is carried in exact CENTS ($1.00-$999.99) so every money
# aggregate stays in integer fixed point (the exact_sum discipline); the
# i*13 stride is injective mod S for i<4 at every fixture scale (S never
# divides 13/26/39), so each part gets exactly 4 DISTINCT suppliers.
# ---------------------------------------------------------------------------

PS_PER_PART = 4

_PARTSUPP_SQL = """
    ps0 AS (
        SELECT p_partkey AS ps_partkey,
               (p_partkey * 7 + i * 13) % (SELECT COUNT(*) FROM supplier)
                   AS ps_suppkey
        FROM part CROSS JOIN (SELECT UNNEST([0, 1, 2, 3]) AS i)
    ),
    partsupp AS (
        SELECT ps_partkey, ps_suppkey,
               CAST((ps_partkey * 31 + ps_suppkey * 17) % 9999 + 1
                    AS INTEGER) AS ps_availqty,
               (ps_partkey * 131 + ps_suppkey * 29) % 99900 + 100
                   AS ps_supplycost_c
        FROM ps0
    )
"""


def derived_partsupp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Spark twin of _PARTSUPP_SQL. Plan shape: part-scan (key column
    only) x 4-row explode + a broadcast 1-row supplier count — no shuffle;
    at any scale this materializes lazily inside the consuming query and
    Catalyst prunes/pushes through it like any view."""
    p = load_table(spark, sf_dir, "part").select("p_partkey")
    s_count = (
        load_table(spark, sf_dir, "supplier")
        .agg(F.count(F.lit(1)).alias("_s"))
    )
    return (
        p.crossJoin(F.broadcast(s_count))
        .select(
            F.col("p_partkey").alias("ps_partkey"),
            "_s",
            F.explode(
                F.sequence(F.lit(0), F.lit(PS_PER_PART - 1))
            ).alias("_i"),
        )
        .select(
            "ps_partkey",
            F.pmod(
                F.col("ps_partkey") * 7 + F.col("_i") * 13, F.col("_s")
            ).alias("ps_suppkey"),
        )
        .withColumn(
            "ps_availqty",
            (
                F.pmod(
                    F.col("ps_partkey") * 31 + F.col("ps_suppkey") * 17,
                    F.lit(9999),
                )
                + 1
            ).cast("int"),
        )
        .withColumn(
            "ps_supplycost_c",
            F.pmod(
                F.col("ps_partkey") * 131 + F.col("ps_suppkey") * 29,
                F.lit(99900),
            )
            + 100,
        )
    )


@query(
    "q_tpch_q2",
    oracle=f"""
    WITH {_PARTSUPP_SQL},
    eu AS (
        SELECT s_suppkey, s_name, s_acctbal, n_name
        FROM supplier
        JOIN nation ON s_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        WHERE r_name = 'EUROPE'
    ),
    cand AS (
        SELECT p_partkey, p_brand, s_suppkey, s_name, s_acctbal, n_name,
               ps_supplycost_c
        FROM part
        JOIN partsupp ON ps_partkey = p_partkey
        JOIN eu ON ps_suppkey = s_suppkey
        WHERE p_type = 'ECONOMY'
    ),
    mn AS (
        SELECT p_partkey, MIN(ps_supplycost_c) AS min_c
        FROM cand GROUP BY 1
    )
    SELECT c.s_acctbal, c.s_name, c.n_name, c.p_partkey, c.p_brand,
           CAST(c.ps_supplycost_c AS DOUBLE) / 100.0 AS ps_supplycost
    FROM cand c JOIN mn ON c.p_partkey = mn.p_partkey
    WHERE c.ps_supplycost_c = mn.min_c
    """,
)
def q_tpch_q2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape (minimum-cost supplier): for every ECONOMY part,
    the EUROPE-region supplier(s) offering it at the region-minimum
    supply cost — the classic correlated-MIN-subquery decorrelation.

    Fixture deviations: partsupp is the derived view (see module note);
    p_mfgr/s_address/s_phone/s_comment don't exist, so the projection
    keeps brand/name/acctbal/nation; the ORDER BY ... LIMIT 100 trim is
    dropped (the driver hashes the full result). The spec's p_size +
    p_type filter is reduced to p_type alone so the sf0.001 slice stays
    non-empty.

    Scale shape: the correlated MIN decorrelates to one groupBy over the
    SAME joined intermediate the outer query needs — computed once (the
    cand plan feeds both sides of a self-join keyed on p_partkey, which
    AQE resolves as a broadcast at validation scale). supplier x nation
    x region collapses to a broadcast dim (eu); partsupp never shuffles
    more than its (part-pruned) 4 rows per part.
    """
    ps = derived_partsupp(spark, sf_dir)
    p = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_type") == "ECONOMY")
        .select("p_partkey", "p_brand")
    )
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(
        F.col("r_name") == "EUROPE"
    )
    eu = (
        s.join(
            F.broadcast(
                n.join(r, F.col("n_regionkey") == F.col("r_regionkey"))
            ),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    # materialized once: cand feeds BOTH the per-part MIN and the final
    # equality filter — without this, the whole part x partsupp x eu join
    # subtree compiles twice (4 part scans / 4 supplier scans observed in
    # the round-5 scan audit). cand is |econ parts| x |their EU
    # suppliers| — dimension-sized, cheap to pin.
    cand = (
        ps.join(p, F.col("ps_partkey") == F.col("p_partkey"))
        .join(
            F.broadcast(eu), F.col("ps_suppkey") == F.col("s_suppkey")
        )
        .select(
            "p_partkey", "p_brand", "s_name", "s_acctbal", "n_name",
            "ps_supplycost_c",
        )
        .localCheckpoint(eager=True)
    )
    mn = cand.groupBy(F.col("p_partkey").alias("_pk")).agg(
        F.min("ps_supplycost_c").alias("min_c")
    )
    return (
        cand.join(
            mn,
            (F.col("p_partkey") == F.col("_pk"))
            & (F.col("ps_supplycost_c") == F.col("min_c")),
        )
        .select(
            "s_acctbal", "s_name", "n_name", "p_partkey", "p_brand",
            (F.col("ps_supplycost_c").cast("double") / 100.0).alias(
                "ps_supplycost"
            ),
        )
    )


@query(
    "q_tpch_q9",
    oracle=f"""
    WITH {_PARTSUPP_SQL}
    SELECT n_name AS nation, CAST(YEAR(o_orderdate) AS BIGINT) AS o_year,
           CAST(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 10000)
                         AS BIGINT)
                    - ps_supplycost_c * CAST(ROUND(l_quantity) AS BIGINT)
                      * 100) AS DOUBLE) / 10000.0 AS sum_profit
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN partsupp ON ps_partkey = l_partkey AND ps_suppkey = l_suppkey
    JOIN orders ON o_orderkey = l_orderkey
    JOIN nation ON n_nationkey = s_nationkey
    WHERE p_name LIKE '%red%'
    GROUP BY 1, 2
    """,
)
def q_tpch_q9(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape (product-type profit): profit by supplier nation and
    order year over the 6-table snowflake, profit = revenue - supply cost,
    parts filtered by name.

    Fixture deviation: the derived partsupp lists 4 suppliers per part, so
    the two-key (partkey, suppkey) join keeps only lineitems supplied
    through a listed relationship — a filter the real table doesn't apply,
    but the optimizer shape (two-key fact-to-partsupp join, the hard part
    of Q9) is exactly the spec's.

    Money: revenue quantized at 4 decimal digits (the exact_sum spelling),
    cost exactly cents x integral quantity x 100 — the whole profit sum is
    integer fixed point at scale 4, order-independent.

    Scale shape: part (name-filtered) and the nation dim broadcast;
    partsupp joins on the same l_partkey the part join already hashed;
    orders joins on orderkey only for its year. One fact scan, partial
    aggs to ~nations x years groups.
    """
    li = load_table(spark, sf_dir, "lineitem")
    p = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_name").like("%red%"))
        .select("p_partkey")
    )
    s = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_nationkey"
    )
    ps = derived_partsupp(spark, sf_dir).select(
        "ps_partkey", "ps_suppkey", "ps_supplycost_c"
    )
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate"
    )
    n = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name"
    )
    profit_e4 = F.round(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 10000
    ).cast("bigint") - F.col("ps_supplycost_c") * F.round(
        "l_quantity"
    ).cast("bigint") * 100
    return (
        li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(
            ps,
            (F.col("ps_partkey") == F.col("l_partkey"))
            & (F.col("ps_suppkey") == F.col("l_suppkey")),
        )
        .join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(F.broadcast(n), F.col("n_nationkey") == F.col("s_nationkey"))
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("bigint").alias("o_year"),
        )
        .agg(
            (F.sum(profit_e4).cast("double") / 10000.0).alias("sum_profit")
        )
    )


Q11_NATIONS = ["NATION_1", "NATION_2", "NATION_3", "NATION_4", "NATION_5"]


@query(
    "q_tpch_q11",
    oracle=f"""
    WITH {_PARTSUPP_SQL},
    natps AS (
        SELECT ps_partkey, ps_supplycost_c * ps_availqty AS v_c
        FROM partsupp
        JOIN supplier ON ps_suppkey = s_suppkey
        JOIN nation ON s_nationkey = n_nationkey
        WHERE n_name IN ({", ".join(f"'{x}'" for x in Q11_NATIONS)})
    ),
    tot AS (
        SELECT SUM(v_c) AS t, COUNT(DISTINCT ps_partkey) AS np FROM natps
    ),
    grp AS (
        SELECT ps_partkey, SUM(v_c) AS part_value_c FROM natps GROUP BY 1
    )
    SELECT ps_partkey,
           CAST(part_value_c AS DOUBLE) / 100.0 AS part_value
    FROM grp, tot
    WHERE part_value_c * np > t
    """,
)
def q_tpch_q11(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape (important stock identification): per-part stock
    value (supplycost x availqty) held by a nation group, keeping parts
    whose value exceeds a corpus-wide threshold — the
    aggregate-vs-global-scalar HAVING pattern.

    Fixture deviation: the spec's threshold FRACTION (0.0001/SF) assumes
    partsupp row counts scale with SF; here the scale-free equivalent is
    "above the MEAN part value", compared in exact integer cents with
    the Q22 trick (v * n_parts > total) so no float division can flip a
    boundary part.

    Scale shape: supplier x nation collapses to a broadcast dim; ONE
    shuffle on ps_partkey produces grp; the 1-row global total broadcasts
    back (tiny-aggregate crossJoin). Value stays in exact cents end to
    end.
    """
    ps = derived_partsupp(spark, sf_dir)
    s = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_nationkey"
    )
    n = load_table(spark, sf_dir, "nation").filter(
        F.col("n_name").isin(Q11_NATIONS)
    )
    natps = (
        ps.join(
            F.broadcast(
                s.join(
                    F.broadcast(n),
                    F.col("s_nationkey") == F.col("n_nationkey"),
                ).select("s_suppkey")
            ),
            F.col("ps_suppkey") == F.col("s_suppkey"),
        )
        .select(
            "ps_partkey",
            (
                F.col("ps_supplycost_c")
                * F.col("ps_availqty").cast("bigint")
            ).alias("v_c"),
        )
        # materialized once: natps feeds BOTH the per-part sums and the
        # global total — without this the partsupp x supplier x nation
        # join compiles twice (round-5 scan audit: supplier x4)
        .localCheckpoint(eager=True)
    )
    grp = natps.groupBy("ps_partkey").agg(
        F.sum("v_c").alias("part_value_c")
    )
    tot = natps.agg(
        F.sum("v_c").alias("t"),
        F.count_distinct("ps_partkey").alias("np"),
    )
    return (
        grp.crossJoin(F.broadcast(tot))
        .filter(F.col("part_value_c") * F.col("np") > F.col("t"))
        .select(
            "ps_partkey",
            (F.col("part_value_c").cast("double") / 100.0).alias(
                "part_value"
            ),
        )
    )


@query(
    "q_tpch_q20",
    oracle=f"""
    WITH {_PARTSUPP_SQL},
    sm AS (
        SELECT p_partkey FROM part WHERE p_name LIKE 'small%'
    ),
    shipped AS (
        SELECT l_partkey, l_suppkey,
               SUM(CAST(ROUND(l_quantity) AS BIGINT)) AS q
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
          AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
        GROUP BY 1, 2
    ),
    cand AS (
        SELECT DISTINCT ps_suppkey
        FROM partsupp
        JOIN sm ON ps_partkey = p_partkey
        JOIN shipped ON l_partkey = ps_partkey AND l_suppkey = ps_suppkey
        WHERE CAST(ps_availqty AS BIGINT) * 2 > q
    )
    SELECT s_suppkey, s_name
    FROM supplier
    JOIN cand ON s_suppkey = ps_suppkey
    JOIN nation ON s_nationkey = n_nationkey
    WHERE n_name IN ({", ".join(f"'{x}'" for x in Q11_NATIONS)})
    """,
)
def q_tpch_q20(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape (potential part promotion): suppliers in a nation
    group holding excess stock — availqty more than half the quantity
    they actually shipped of some name-matched part in 1997. The nested
    EXISTS-over-derived-aggregate decorrelation stress test the suite
    still lacked (round-4 verdict #3).

    Fixture deviations: derived partsupp; the spec's single-nation filter
    widens to the Q11 nation group so the sf0.001 slice stays non-empty;
    the half-quantity threshold is compared in exact integers
    (availqty * 2 > q, quantities are integral).

    Scale shape: both nested subqueries decorrelate to joins against
    partsupp — sm broadcasts (name-filtered part keys), shipped is ONE
    date-pruned fact aggregate on exactly the (partkey, suppkey) key the
    partsupp probe needs, then DISTINCT + a broadcast nation-filtered
    supplier join. No correlated re-scan of lineitem per supplier, which
    is the trap Q20 sets.
    """
    ps = derived_partsupp(spark, sf_dir)
    sm = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_name").like("small%"))
        .select("p_partkey")
    )
    li = load_table(spark, sf_dir, "lineitem")
    shipped = (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp_ntz"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp_ntz"))
        )
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum(F.round("l_quantity").cast("bigint")).alias("q"))
    )
    cand = (
        ps.join(F.broadcast(sm), F.col("ps_partkey") == F.col("p_partkey"))
        .join(
            shipped,
            (F.col("l_partkey") == F.col("ps_partkey"))
            & (F.col("l_suppkey") == F.col("ps_suppkey")),
        )
        .filter(F.col("ps_availqty").cast("bigint") * 2 > F.col("q"))
        .select("ps_suppkey")
        .distinct()
    )
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation").filter(
        F.col("n_name").isin(Q11_NATIONS)
    )
    return (
        s.join(cand, F.col("s_suppkey") == F.col("ps_suppkey"))
        .join(
            F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey")
        )
        .select("s_suppkey", "s_name")
    )
