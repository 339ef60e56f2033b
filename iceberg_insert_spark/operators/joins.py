"""Join operators (SURVEY.md §2.4): all 9 declared join shapes.

Physical strategy notes (100 TB posture):
  * Catalyst/AQE picks broadcast vs sort-merge from runtime stats; we pin
    ``broadcast()`` only where the small side is provably dimension-sized
    (region/nation) or where a nested-loop would otherwise materialize
    (theta/cross joins).
  * The as-of join has no Spark primitive; it is rewritten as a union +
    window-function pass — one shuffle on the join key, no row explosion,
    which is the scalable formulation (a range self-join would be O(n^2)
    per user).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import query
from ..tables import exact_sum, load_table


@query(
    "q_join_inner_equi",
    oracle="""
    SELECT o_orderkey, o_totalprice, c_name, c_mktsegment
    FROM orders JOIN customer ON o_custkey = c_custkey
    WHERE c_acctbal > 1000
    """,
)
def q_join_inner_equi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inner equi-join orders x customer; AQE will broadcast the filtered dim."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer").filter(F.col("c_acctbal") > 1000)
    return o.join(c, o.o_custkey == c.c_custkey, "inner").select(
        "o_orderkey", "o_totalprice", "c_name", "c_mktsegment"
    )


@query(
    "q_join_multi",
    oracle="""
    SELECT l_orderkey,
           CAST(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 10000)
                         AS BIGINT)) AS DOUBLE) / 10000.0 AS revenue,
           o_orderdate, o_orderpriority
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
      AND l_shipdate  > TIMESTAMP '1998-03-15 00:00:00'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, o_orderdate, l_orderkey
    LIMIT 10
    """,
)
def q_join_multi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship (TPC-H Q3 shape): 3-way join + agg + top-k.

    customer is broadcast (dimension-sized after the segment filter); the
    orders<->lineitem join shuffles on the order key; LIMIT after ORDER BY
    becomes TakeOrderedAndProject (no global sort materialization).
    """
    c = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-03-15 00:00:00").cast("timestamp_ntz")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-03-15 00:00:00").cast("timestamp_ntz")
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            # exact fixed-point sum (tables.exact_sum): partition-order-
            # independent, so the revenue-ordered top-k is deterministic too.
            exact_sum(
                F.col("l_extendedprice") * (1 - F.col("l_discount")), 4
            ).alias("revenue")
        )
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.desc("revenue"), F.asc("o_orderdate"), F.asc("l_orderkey"))
        .limit(10)
    )


@query(
    "q_join_left_outer",
    oracle="""
    SELECT c_custkey, c_name, o_orderkey, o_totalprice
    FROM customer LEFT JOIN orders
      ON c_custkey = o_custkey AND o_orderstatus = 'F'
    """,
)
def q_join_left_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left outer with a join-side predicate (kept in the ON clause, not WHERE)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    cond = (c.c_custkey == o.o_custkey) & (o.o_orderstatus == "F")
    return c.join(o, cond, "left").select(
        "c_custkey", "c_name", "o_orderkey", "o_totalprice"
    )


@query(
    "q_join_full_outer",
    oracle="""
    WITH s AS (SELECT s_nationkey AS nk, COUNT(*) AS n_supp FROM supplier GROUP BY 1),
         c AS (SELECT c_nationkey AS nk, COUNT(*) AS n_cust FROM customer GROUP BY 1)
    SELECT COALESCE(s.nk, c.nk) AS nationkey, n_supp, n_cust
    FROM s FULL OUTER JOIN c ON s.nk = c.nk
    """,
)
def q_join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full outer join of per-nation supplier/customer counts (nulls preserved)."""
    s = (
        load_table(spark, sf_dir, "supplier")
        .groupBy(F.col("s_nationkey").alias("s_nk"))
        .agg(F.count(F.lit(1)).alias("n_supp"))
    )
    c = (
        load_table(spark, sf_dir, "customer")
        .groupBy(F.col("c_nationkey").alias("c_nk"))
        .agg(F.count(F.lit(1)).alias("n_cust"))
    )
    return s.join(c, s.s_nk == c.c_nk, "full").select(
        F.coalesce(s.s_nk, c.c_nk).alias("nationkey"), "n_supp", "n_cust"
    )


@query(
    "q_join_semi",
    oracle="""
    SELECT o_orderkey, o_totalprice
    FROM orders
    WHERE EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey AND l_quantity > 45)
    """,
)
def q_join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left semi join (EXISTS): orders having a high-quantity line."""
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_quantity") > 45)
    return o.join(li, o.o_orderkey == li.l_orderkey, "left_semi").select(
        "o_orderkey", "o_totalprice"
    )


@query(
    "q_join_anti",
    oracle="""
    SELECT c_custkey, c_name, c_mktsegment
    FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    """,
)
def q_join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left anti join (NOT EXISTS): customers with no orders."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        "c_custkey", "c_name", "c_mktsegment"
    )


@query(
    "q_join_cross",
    oracle="""
    SELECT r_name, n_name
    FROM region CROSS JOIN nation
    """,
)
def q_join_cross(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross join of the two tiny dims (5 x 25); broadcast nested loop."""
    r = load_table(spark, sf_dir, "region")
    n = load_table(spark, sf_dir, "nation")
    return r.crossJoin(F.broadcast(n)).select("r_name", "n_name")


@query(
    "q_join_theta_range",
    oracle="""
    SELECT a.n_name AS name_a, b.n_name AS name_b
    FROM nation a JOIN nation b
      ON a.n_nationkey < b.n_nationkey
     AND a.n_regionkey = b.n_regionkey
    """,
)
def q_join_theta_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theta (non-equi) self-join: unordered nation pairs within a region.

    The equi component (n_regionkey) lets Catalyst hash-partition; the `<`
    residual avoids self/duplicate pairs. Small side broadcast-pinned.
    """
    n = load_table(spark, sf_dir, "nation")
    a = n.alias("a")
    b = n.alias("b")
    cond = (F.col("a.n_nationkey") < F.col("b.n_nationkey")) & (
        F.col("a.n_regionkey") == F.col("b.n_regionkey")
    )
    return a.join(F.broadcast(b), cond, "inner").select(
        F.col("a.n_name").alias("name_a"), F.col("b.n_name").alias("name_b")
    )


@query(
    "q_join_asof",
    oracle="""
    SELECT p.event_id, p.user_id, epoch_us(CAST(p.ts AS TIMESTAMP)) AS ts_us,
           prev.event_id AS prev_event_id, prev.event_type AS prev_event_type,
           prev.value AS prev_value
    FROM events p
    LEFT JOIN LATERAL (
        SELECT e.event_id, e.event_type, e.value
        FROM events e
        WHERE e.user_id = p.user_id AND e.ts < p.ts
        ORDER BY e.ts DESC, e.event_id DESC
        LIMIT 1
    ) prev ON true
    WHERE p.event_type = 'purchase'
    """,
)
def q_join_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: each purchase -> latest strictly-earlier event of same user.

    Spark has no batch ASOF JOIN; the scalable rewrite is union + one window
    pass partitioned by user_id (single shuffle, no O(n^2) pair blow-up):

      * probe rows sort BEFORE base rows at equal ts (is_probe DESC) so a
        same-timestamp base event is excluded — strict `<` semantics;
      * ``last(<base struct>, ignoreNulls)`` over rows(-inf, -1) picks the
        latest prior base event, ties broken by event_id (ascending order =>
        max event_id wins, matching the oracle's ORDER BY event_id DESC).
    """
    ev = load_table(spark, sf_dir, "events")
    base = ev.select(
        "user_id",
        "ts",
        "event_id",
        "event_type",
        "value",
        F.lit(0).alias("is_probe"),
    )
    probe = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        "ts",
        "event_id",
        "event_type",
        "value",
        F.lit(1).alias("is_probe"),
    )
    u = base.unionByName(probe)
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.asc("ts"), F.desc("is_probe"), F.asc("event_id"))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    prev_struct = F.last(
        F.when(
            F.col("is_probe") == 0,
            F.struct(
                F.col("event_id").alias("pid"),
                F.col("event_type").alias("ptype"),
                F.col("value").alias("pval"),
            ),
        ),
        ignorenulls=True,
    ).over(w)
    return (
        u.withColumn("prev", prev_struct)
        .filter(F.col("is_probe") == 1)
        .select(
            "event_id",
            "user_id",
            F.expr(
                "timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)"
            ).alias("ts_us"),
            F.col("prev.pid").alias("prev_event_id"),
            F.col("prev.ptype").alias("prev_event_type"),
            F.col("prev.pval").alias("prev_value"),
        )
    )


@query(
    "q_join_star",
    oracle="""
    SELECT n_name,
           CAST(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 10000)
                         AS BIGINT)) AS DOUBLE) / 10000.0 AS revenue,
           COUNT(*) AS n_items
    FROM region
    JOIN nation   ON n_regionkey = r_regionkey
    JOIN customer ON c_nationkey = n_nationkey
    JOIN orders   ON o_custkey = c_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON s_suppkey = l_suppkey AND s_nationkey = c_nationkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY n_name
    """,
)
def q_join_star(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: 6-table star join + aggregate.

    Scale layout: region/nation/supplier are broadcast (dimension-sized at
    any SF); customer-orders-lineitem chain shuffles on its keys with the
    o_orderdate filter pushed to the orders scan so the fact join input is
    pruned first. AQE reorders/shrinks the remaining exchanges at runtime.
    """
    r = F.broadcast(
        load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    )
    n = F.broadcast(load_table(spark, sf_dir, "nation"))
    s = F.broadcast(load_table(spark, sf_dir, "supplier"))
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp_ntz"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    return (
        r.join(n, n.n_regionkey == r.r_regionkey)
        .join(c, c.c_nationkey == n.n_nationkey)
        .join(o, o.o_custkey == c.c_custkey)
        .join(li, li.l_orderkey == o.o_orderkey)
        .join(
            s,
            (s.s_suppkey == li.l_suppkey) & (s.s_nationkey == c.c_nationkey),
        )
        .groupBy("n_name")
        .agg(
            # exact fixed-point sum (tables.exact_sum) — large per-nation
            # groups make a double sum's last ulp a real driver-hash risk.
            exact_sum(
                F.col("l_extendedprice") * (1 - F.col("l_discount")), 4
            ).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


SAMPLE_HEX_LT = "199a"  # md5-prefix < 0x199a/0x10000 ~ 10.0%


@query(
    "q_sample",
    oracle=f"""
    SELECT COUNT(*) AS n_rows,
           CAST(SUM(CAST(ROUND(l_quantity * 100) AS BIGINT)) AS DOUBLE)
               / 100.0 AS sum_qty
    FROM lineitem
    WHERE SUBSTRING(MD5(CONCAT_WS('#', CAST(l_orderkey AS VARCHAR),
                                  CAST(l_linenumber AS VARCHAR), '42')),
                    1, 4) < '{SAMPLE_HEX_LT}'
    """,
)
def q_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic ~10% hash sample + aggregate — the REPRODUCIBLE
    sampling flavor (round-5 upgrade from a rows-only seeded
    Bernoulli): the keep decision is a pure function of the row
    key (md5 of (l_orderkey, l_linenumber, seed), first 4 hex chars
    < 0x199a ~ 10%), so any engine — here Spark and the DuckDB twin —
    selects the IDENTICAL rows, and re-runs are stable across cluster
    sizes and partitionings, which seeded engine samplers are not.

    At scale this is the standard cheap-stats / data-exploration path:
    the filter is evaluated inside the scan stage (no shuffle), and the
    same keyed-hash idiom powers the repo's train/test split
    (q_docs_split) and shuffle (q_docs_shuffle)."""
    li = load_table(spark, sf_dir, "lineitem")
    key = F.md5(
        F.concat_ws(
            "#",
            F.col("l_orderkey").cast("string"),
            F.col("l_linenumber").cast("string"),
            F.lit("42"),
        )
    )
    return li.filter(F.substring(key, 1, 4) < SAMPLE_HEX_LT).agg(
        F.count(F.lit(1)).alias("n_rows"),
        exact_sum(F.col("l_quantity"), 2).alias("sum_qty"),
    )


RANGE_JOIN_BUCKET_US = 300_000_000  # 5 minutes


@query(
    "q_join_time_range",
    oracle="""
    SELECT a.event_id AS event_a, b.event_id AS event_b,
           CAST(epoch_us(b.ts) - epoch_us(a.ts) AS BIGINT) AS gap_us
    FROM events a JOIN events b
      ON a.user_id = b.user_id
     AND b.ts > a.ts
     AND b.ts <= a.ts + INTERVAL 5 MINUTES
    """,
)
def q_join_time_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-range join (pairs of same-user events <= 5 min apart) via bucket
    equi-join — the scalable rewrite of an interval theta-join.

    Each left row replicates into its own 5-min bucket and the next one (a
    right match can only live there), the join is then a plain equi-join on
    (user_id, bucket) + an exact refine predicate. Cost: 2x replication of
    one side instead of the O(n^2)-per-user nested loop a raw inequality
    join plans; no row can match twice (the two buckets are disjoint).
    """
    from ..tables import epoch_us

    ev = load_table(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    a = ev.select(
        F.col("event_id").alias("event_a"),
        "user_id",
        epoch_us("ts").alias("ta"),
    ).withColumn(
        "bucket",
        F.explode(
            F.array(
                F.expr(f"ta div {RANGE_JOIN_BUCKET_US}"),
                F.expr(f"ta div {RANGE_JOIN_BUCKET_US}") + 1,
            )
        ),
    )
    b = ev.select(
        F.col("event_id").alias("event_b"),
        "user_id",
        epoch_us("ts").alias("tb"),
    ).withColumn("bucket", F.expr(f"tb div {RANGE_JOIN_BUCKET_US}"))
    return (
        a.join(b, ["user_id", "bucket"])
        .filter(
            (F.col("tb") > F.col("ta"))
            & (F.col("tb") <= F.col("ta") + RANGE_JOIN_BUCKET_US)
        )
        .select(
            "event_a",
            "event_b",
            (F.col("tb") - F.col("ta")).cast("bigint").alias("gap_us"),
        )
    )


@query(
    "q_funnel",
    oracle="""
    WITH s AS (
        SELECT user_id, MIN(ts) AS signup_ts
        FROM events WHERE event_type = 'signup' GROUP BY user_id
    ), g AS (
        SELECT s.user_id, s.signup_ts,
               MIN(CASE WHEN e.ts > s.signup_ts THEN e.ts END) AS purch_ts
        FROM s LEFT JOIN events e
          ON e.user_id = s.user_id AND e.event_type = 'purchase'
        GROUP BY s.user_id, s.signup_ts
    )
    SELECT COUNT(*) AS n_signup_users,
           COUNT(purch_ts) AS n_converted,
           CAST(COALESCE(SUM(epoch_us(purch_ts) - epoch_us(signup_ts)), 0)
                AS BIGINT) AS total_gap_us
    FROM g
    """,
)
def q_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event funnel: signup -> first later purchase, conversion count + total
    time-to-convert. One shuffle on user_id for the signup aggregate, one
    shuffled left join against the purchase slice (filter pushed to the
    scan), then a global agg — no per-user iteration anywhere."""
    from ..tables import epoch_us

    ev = load_table(spark, sf_dir, "events")
    s = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("signup_ts"))
    )
    p = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("ts").alias("pts")
    )
    g = (
        s.join(p, "user_id", "left")
        .groupBy("user_id", "signup_ts")
        .agg(
            F.min(
                F.when(F.col("pts") > F.col("signup_ts"), F.col("pts"))
            ).alias("purch_ts")
        )
    )
    return g.agg(
        F.count(F.lit(1)).alias("n_signup_users"),
        F.count("purch_ts").alias("n_converted"),
        F.coalesce(
            F.sum(epoch_us("purch_ts") - epoch_us("signup_ts")), F.lit(0)
        )
        .cast("bigint")
        .alias("total_gap_us"),
    )


@query(
    "q_funnel3",
    oracle="""
    WITH v AS (
        SELECT user_id, MIN(ts) AS t1
        FROM events WHERE event_type = 'view' GROUP BY user_id
    ), c AS (
        SELECT v.user_id, v.t1,
               MIN(CASE WHEN e.ts > v.t1 THEN e.ts END) AS t2
        FROM v LEFT JOIN events e
          ON e.user_id = v.user_id AND e.event_type = 'click'
        GROUP BY v.user_id, v.t1
    ), p AS (
        SELECT c.user_id, c.t1, c.t2,
               MIN(CASE WHEN e.ts > c.t2 THEN e.ts END) AS t3
        FROM c LEFT JOIN events e
          ON e.user_id = c.user_id AND e.event_type = 'purchase'
        GROUP BY c.user_id, c.t1, c.t2
    )
    SELECT COUNT(*) AS n_view,
           COUNT(t2) AS n_click,
           COUNT(t3) AS n_purchase,
           CAST(COUNT(t2) * 1000000 // GREATEST(COUNT(*), 1) AS BIGINT)
               AS click_conv_ppm,
           CAST(COUNT(t3) * 1000000 // GREATEST(COUNT(t2), 1) AS BIGINT)
               AS purchase_conv_ppm
    FROM p
    """,
)
def q_funnel3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Three-stage STRICTLY-ORDERED funnel (view -> first later click ->
    first later purchase): per-stage user counts and stage-to-stage
    conversion ppm — the multi-stage extension of q_funnel's two-stage
    shape, and the standard product-analytics query.

    Ordering matters: a click BEFORE the first view doesn't advance the
    funnel (MIN over ts > prev_stage_ts), which is what distinguishes this
    from three independent existence checks. Each stage is one shuffled
    left join of the per-user frontier against the stage's event slice
    (event-type filter pushed to the scan) + a user-keyed aggregate. The
    frontier stays CONSTANT at the view-stage user set (left joins keep
    non-converters, whose stage timestamps are simply NULL) — deliberately:
    filtering to t2 IS NOT NULL before the purchase join would shrink the
    left side but force re-materializing the frontier lineage for the
    final n_view/n_click counts, and per-user frontier rows are already
    ≪ the event stream. No window over the raw event stream, no per-user
    iteration. Conversion ratios are integral ppm on positive counts.
    """
    ev = load_table(spark, sf_dir, "events")
    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", F.col("ts").alias("cts")
    )
    c = (
        v.join(clicks, "user_id", "left")
        .groupBy("user_id", "t1")
        .agg(
            F.min(
                F.when(F.col("cts") > F.col("t1"), F.col("cts"))
            ).alias("t2")
        )
    )
    purch = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("ts").alias("pts")
    )
    p = (
        c.join(purch, "user_id", "left")
        .groupBy("user_id", "t1", "t2")
        .agg(
            F.min(
                F.when(F.col("pts") > F.col("t2"), F.col("pts"))
            ).alias("t3")
        )
    )
    # both divisors GREATEST-guarded: an empty view slice would otherwise
    # throw DIVIDE_BY_ZERO in Spark (ANSI) while DuckDB's // yields NULL
    return p.agg(
        F.count(F.lit(1)).alias("n_view"),
        F.count("t2").alias("n_click"),
        F.count("t3").alias("n_purchase"),
        F.expr(
            "COUNT(t2) * 1000000 div GREATEST(COUNT(*), 1L)"
        ).alias("click_conv_ppm"),
        F.expr(
            "COUNT(t3) * 1000000 div GREATEST(COUNT(t2), 1L)"
        ).alias("purchase_conv_ppm"),
    )


BUCKETED_TABLE_BUCKETS = 8
BUCKETED_TABLE_DIR = "/tmp/iceberg_insert_spark/bucketed"


@query(
    "q_join_bucketed",
    oracle="""
    SELECT c_mktsegment, COUNT(*) AS n_orders,
           CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS DOUBLE)
               / 100.0 AS sum_price
    FROM orders JOIN customer ON o_custkey = c_custkey
    GROUP BY c_mktsegment
    """,
)
def q_join_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Co-located join on pre-bucketed tables: zero shuffle at join time.

    Both sides are written bucketBy(8, custkey) + sortBy — Spark's
    counterpart of Iceberg's bucket(N) write distribution. Reading them back,
    the sort-merge join consumes the bucket layout directly (no Exchange
    before the join; asserted in tests/test_plans.py). At 100 TB this is THE
    repeated-join amortization: pay the layout shuffle once at write time,
    join for free forever after.
    """
    import re

    tag = re.sub(r"\W", "_", sf_dir.rstrip("/").split("/")[-1])
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    specs = [
        ("orders", o, "o_custkey"),
        ("customer", c, "c_custkey"),
    ]
    for name, df, key in specs:
        tbl = f"bkt_{name}_{tag}"
        if not spark.catalog.tableExists(tbl):
            (
                df.write.bucketBy(BUCKETED_TABLE_BUCKETS, key)
                .sortBy(key)
                .mode("overwrite")
                .format("parquet")
                .option("path", f"{BUCKETED_TABLE_DIR}/{tag}/{name}")
                .saveAsTable(tbl)
            )
    bo = spark.table(f"bkt_orders_{tag}")
    bc = spark.table(f"bkt_customer_{tag}")
    return (
        bo.join(bc, bo.o_custkey == bc.c_custkey)
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            exact_sum(F.col("o_totalprice")).alias("sum_price"),
        )
    )


@query(
    "q_tpch_q14",
    oracle="""
    SELECT ROUND(
             100.0 * (CAST(SUM(CAST(ROUND(CASE WHEN p_type = 'PROMO'
                                   THEN l_extendedprice * (1 - l_discount)
                                   ELSE 0.0 END * 10000) AS BIGINT))
                           AS DOUBLE) / 10000.0)
             / (CAST(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount)
                                    * 10000) AS BIGINT))
                     AS DOUBLE) / 10000.0), 4)
           AS promo_revenue
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-04-01 00:00:00'
    """,
)
def q_tpch_q14(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: promo revenue share — fact-dimension join feeding a
    conditional-sum ratio. part broadcasts; the shipdate range prunes the
    lineitem scan before the join."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp_ntz"))
    )
    p = F.broadcast(load_table(spark, sf_dir, "part"))
    # Both sums in exact fixed-point (tables.exact_sum): partition-order-
    # independent; the ratio is then one double division of identical
    # operands in both engines.
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo = F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0.0))
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .agg(
            F.round(
                100.0 * exact_sum(promo, 4) / exact_sum(rev, 4),
                4,
            ).alias("promo_revenue")
        )
    )


SALT_FACTOR = 8


def salted_join(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
    salt: int = SALT_FACTOR,
) -> DataFrame:
    """Skew-salted inner equi-join: the manual fallback when AQE's runtime
    skew split isn't enough (e.g. one key holds >10% of a 100 TB table).

    The skewed (left) side gets a random-but-deterministic salt in [0, salt)
    appended to its key; the small (right) side is replicated `salt` ways so
    every salted key still finds its match. One hot key's rows now spread
    over `salt` reducers. Result is row-identical to the plain join
    (asserted in tests/test_salted_join.py).
    """
    salted_l = left.withColumn(
        "_salt", F.pmod(F.xxhash64(F.monotonically_increasing_id()), salt)
    )
    salted_r = right.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(salt)]))
    )
    return salted_l.join(
        salted_r,
        (salted_l[left_key] == salted_r[right_key])
        & (salted_l["_salt"] == salted_r["_salt"]),
    ).drop("_salt")


@query(
    "q_upsert",
    oracle="""
    WITH base AS (
        SELECT * FROM orders WHERE o_orderkey % 10 >= 2
    ), changes AS (
        SELECT o_orderkey, o_custkey, 'U' AS o_orderstatus,
               o_totalprice * 2 AS o_totalprice, o_orderdate, o_orderpriority
        FROM orders WHERE o_orderkey % 10 < 4
    )
    SELECT * FROM changes
    UNION ALL
    SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderdate,
           o_orderpriority
    FROM base
    WHERE o_orderkey NOT IN (SELECT o_orderkey FROM changes)
    """,
)
def q_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC upsert (MERGE semantics without MERGE): changes take precedence,
    unmatched base rows survive — `changes UNION ALL (base ANTI-JOIN
    changes)`. One shuffle per side on the key; with the Iceberg runtime the
    same intent is `MERGE INTO` and the anti-join happens inside the
    copy-on-write/merge-on-read machinery. Base = keys %10>=2, changes =
    keys %10<4, so the mix covers updates (2,3), inserts (0,1), and
    untouched rows.
    """
    cols = [
        "o_orderkey",
        "o_custkey",
        "o_orderstatus",
        "o_totalprice",
        "o_orderdate",
        "o_orderpriority",
    ]
    o = load_table(spark, sf_dir, "orders")
    base = o.filter(F.col("o_orderkey") % 10 >= 2).select(cols)
    changes = o.filter(F.col("o_orderkey") % 10 < 4).select(
        "o_orderkey",
        "o_custkey",
        F.lit("U").alias("o_orderstatus"),
        (F.col("o_totalprice") * 2).alias("o_totalprice"),
        "o_orderdate",
        "o_orderpriority",
    )
    survivors = base.join(changes.select("o_orderkey"), "o_orderkey", "left_anti")
    return changes.unionByName(survivors.select(cols))


@query(
    "q_tpch_q13",
    oracle="""
    SELECT c_count, COUNT(*) AS custdist
    FROM (
        SELECT c_custkey, COUNT(o_orderkey) AS c_count
        FROM customer
        LEFT JOIN orders ON c_custkey = o_custkey
                        AND o_orderpriority <> '1-URGENT'
        GROUP BY c_custkey
    )
    GROUP BY c_count
    """,
)
def q_tpch_q13(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: customer order-count distribution — outer join with a
    join-time (not post-join) predicate, then a two-level aggregate.

    The non-urgent filter MUST live in the join condition: pushing it below a
    left join as a WHERE would drop zero-order customers instead of counting
    them at c_count=0. Shuffle profile: one exchange on custkey for join+first
    agg (same key, reused), one tiny exchange on c_count."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    per_cust = (
        c.join(
            o.withColumnRenamed("o_custkey", "c_custkey").filter(
                F.col("o_orderpriority") != "1-URGENT"
            ),
            "c_custkey",
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(
        F.count(F.lit(1)).alias("custdist")
    )


TPCH_Q18_QTY = 200


@query(
    "q_tpch_q18",
    oracle=f"""
    SELECT c_custkey, o_orderkey,
           epoch_us(CAST(o_orderdate AS TIMESTAMP)) AS o_orderdate_us,
           ROUND(SUM(l_quantity), 2) AS total_qty
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON o_orderkey = l_orderkey
    WHERE o_orderkey IN (
        SELECT l_orderkey FROM lineitem
        GROUP BY l_orderkey HAVING SUM(l_quantity) > {TPCH_Q18_QTY}
    )
    GROUP BY c_custkey, o_orderkey, o_orderdate
    """,
)
def q_tpch_q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape (large-volume orders): HAVING on a grouped sum feeding
    a semi-join back into the fact table.

    The HAVING subquery aggregates lineitem FIRST (map-side partials make the
    big-order list tiny), then semi-joins — at 100 TB the filter list is
    dimension-sized and broadcastable while the naive order (join first,
    filter later) would shuffle the full join. l_quantity is integral so the
    sums are exact in double."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("q"))
        .filter(F.col("q") > TPCH_Q18_QTY)
        .select("l_orderkey")
    )
    from ..tables import epoch_us

    return (
        li.join(F.broadcast(big), "l_orderkey", "left_semi")
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .groupBy("c_custkey", "o_orderkey", "o_orderdate")
        .agg(F.round(F.sum("l_quantity"), 2).alias("total_qty"))
        .select(
            "c_custkey",
            "o_orderkey",
            epoch_us("o_orderdate").alias("o_orderdate_us"),
            "total_qty",
        )
    )


TPCH_Q3_CUTOFF = "1998-06-01"


@query(
    "q_tpch_q3",
    oracle=f"""
    SELECT l_orderkey,
           CAST(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 10000)
                         AS BIGINT)) AS DOUBLE) / 10000.0 AS revenue,
           epoch_us(CAST(o_orderdate AS TIMESTAMP)) AS o_orderdate_us,
           o_orderpriority
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '{TPCH_Q3_CUTOFF} 00:00:00'
      AND l_shipdate  > TIMESTAMP '{TPCH_Q3_CUTOFF} 00:00:00'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
)
def q_tpch_q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape (shipping priority): segment-filtered customers x
    date-filtered orders x lineitem, revenue per order, top 10.

    Scale shape: the BUILDING customer-key set is dimension-sized ->
    broadcast semi-join prunes orders BEFORE the fact join, so the one
    big shuffle (orders x lineitem on orderkey) moves only pre-filtered
    rows; both date predicates push to the parquet scans; the final top-10
    plans as TakeOrderedAndProject ((revenue DESC, l_orderkey) is a total
    order, so the LIMIT boundary is deterministic). Revenue accumulates in
    exact fixed-point (tables.exact_sum) — partition-order-independent."""
    cutoff = F.lit(TPCH_Q3_CUTOFF).cast("timestamp_ntz")
    c = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == "BUILDING")
        .select("c_custkey")
    )
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderdate") < cutoff)
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > cutoff
    )
    from ..tables import epoch_us, exact_sum

    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        o.join(
            F.broadcast(c), o.o_custkey == F.col("c_custkey"), "left_semi"
        )
        .join(li, F.col("o_orderkey") == li.l_orderkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(exact_sum(rev, 4).alias("revenue"))
        .select(
            "l_orderkey",
            "revenue",
            epoch_us("o_orderdate").alias("o_orderdate_us"),
            "o_orderpriority",
        )
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


@query(
    "q_tpch_q10",
    oracle="""
    SELECT c_custkey, c_name,
           CAST(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 10000)
                         AS BIGINT)) AS DOUBLE) / 10000.0 AS revenue,
           ROUND(c_acctbal, 2) AS c_acctbal, n_name
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation   ON c_nationkey = n_nationkey
    WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1996-04-01 00:00:00'
      AND l_returnflag = 'R'
    GROUP BY c_custkey, c_name, c_acctbal, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
)
def q_tpch_q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape (returned-item reporting): which customers returned
    the most revenue in a quarter — fact-fact join on orderkey, customer +
    nation enrichment, top 20.

    Scale shape: both selective predicates (quarter on orders, returnflag on
    lineitem) push to their scans BEFORE the orderkey shuffle; nation (25
    rows) broadcasts; the top-20 plans as TakeOrderedAndProject over the
    per-customer partial aggregates. Revenue accumulates exact fixed-point
    (tables.exact_sum). (revenue DESC, c_custkey) totally orders the LIMIT
    boundary."""
    from ..tables import exact_sum

    cutlo = F.lit("1996-01-01").cast("timestamp_ntz")
    cuthi = F.lit("1996-04-01").cast("timestamp_ntz")
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= cutlo) & (F.col("o_orderdate") < cuthi)
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_returnflag") == "R"
    )
    n = F.broadcast(load_table(spark, sf_dir, "nation"))
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        o.join(li, F.col("o_orderkey") == li.l_orderkey)
        .join(c, F.col("o_custkey") == c.c_custkey)
        .join(n, c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(exact_sum(rev, 4).alias("revenue"))
        .select(
            "c_custkey",
            "c_name",
            "revenue",
            F.round("c_acctbal", 2).alias("c_acctbal"),
            "n_name",
        )
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


@query(
    "q_join_skew_salted",
    oracle="""
    SELECT e.event_id, e.user_id,
           ROUND(e.value, 2) AS value, c.c_mktsegment
    FROM events e JOIN customer c ON e.user_id = c.c_custkey
    WHERE e.event_type = 'purchase'
    """,
)
def q_join_skew_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-salted join surfaced as a query: purchases joined to their
    customer row through `salted_join`, oracled against the PLAIN SQL join —
    salting is a physical rewrite and must be row-invisible.

    When one user owns >10% of a 100 TB event stream, a hash join sends all
    its rows to one reducer; the salt spreads them over SALT_FACTOR
    reducers at the cost of replicating the (dimension-sized) build side
    SALT_FACTOR ways. AQE's skewedJoin handles moderate skew at runtime;
    this is the manual escape hatch for pathological keys, kept
    result-identical (this oracle + the row-equivalence property test in
    tests/test_salted_join.py)."""
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type") == "purchase"
    )
    c = load_table(spark, sf_dir, "customer")
    joined = salted_join(ev, c, "user_id", "c_custkey")
    return joined.select(
        "event_id",
        "user_id",
        F.round("value", 2).alias("value"),
        "c_mktsegment",
    )


@query(
    "q_cdc_apply_changelog",
    oracle="""
    WITH base AS (
        SELECT event_id AS k, event_type, ROUND(value, 2) AS value
        FROM events WHERE event_id % 10 < 8
    ), chg AS (
        SELECT event_id - 5 AS k, event_id AS seq,
               CASE WHEN event_id % 3 = 0 THEN 'D' ELSE 'U' END AS op,
               ROUND(value, 2) AS value
        FROM events WHERE event_id % 10 >= 8
    ), latest AS (
        SELECT k, op, value
        FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY k
                                           ORDER BY seq DESC) AS rn
              FROM chg)
        WHERE rn = 1
    )
    SELECT b.k, b.event_type, b.value, 'base' AS src
    FROM base b LEFT JOIN latest l ON b.k = l.k
    WHERE l.k IS NULL
    UNION ALL
    SELECT k, 'updated' AS event_type, value, 'cdc' AS src
    FROM latest WHERE op = 'U'
    """,
)
def q_cdc_apply_changelog(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC changelog apply with DELETES (the Debezium-feed pattern,
    completing q_upsert which only handles inserts/updates): collapse the
    change stream to the LATEST operation per key (row_number over the
    change sequence), then deletes remove base rows, updates replace them,
    and update-ops for unseen keys insert.

    Fixture mapping: events with event_id % 10 >= 8 play the change feed
    against a base of the remaining events; each change targets key
    event_id - 5 (so some hit base keys, some insert) and is a delete when
    event_id % 3 == 0; event_id itself is the changelog sequence.

    Scale shape: the changelog collapse is a rank-1 window on the key (one
    shuffle of the — much smaller — change feed); the apply is one anti-
    join on the key plus a union. With the Iceberg runtime this is exactly
    `MERGE INTO ... WHEN MATCHED AND op='D' THEN DELETE` (gated like
    q_upsert, warehouse_sink.iceberg_available); the DataFrame rewrite is
    result-identical and engine-portable.
    """
    ev = load_table(spark, sf_dir, "events")
    base = ev.filter(F.col("event_id") % 10 < 8).select(
        F.col("event_id").alias("k"),
        "event_type",
        F.round("value", 2).alias("value"),
    )
    chg = ev.filter(F.col("event_id") % 10 >= 8).select(
        (F.col("event_id") - 5).alias("k"),
        F.col("event_id").alias("seq"),
        F.when(F.col("event_id") % 3 == 0, "D").otherwise("U").alias("op"),
        F.round("value", 2).alias("value"),
    )
    w = Window.partitionBy("k").orderBy(F.desc("seq"))
    latest = (
        chg.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("k", "op", "value")
    )
    survivors = base.join(latest, "k", "left_anti").select(
        "k", "event_type", "value", F.lit("base").alias("src")
    )
    applied = latest.filter(F.col("op") == "U").select(
        "k",
        F.lit("updated").alias("event_type"),
        "value",
        F.lit("cdc").alias("src"),
    )
    return survivors.unionAll(applied)


@query(
    "q_join_null_safe",
    oracle="""
    WITH a AS (
        SELECT NULLIF(l_returnflag, 'N') AS rf, COUNT(*) AS n_lines
        FROM lineitem GROUP BY 1
    ), b AS (
        SELECT NULLIF(l_returnflag, 'N') AS rf,
               CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT))
                    AS DOUBLE) / 100.0 AS revenue
        FROM lineitem GROUP BY 1
    )
    SELECT a.rf, a.n_lines, b.revenue
    FROM a JOIN b ON a.rf IS NOT DISTINCT FROM b.rf
    """,
)
def q_join_null_safe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equality join (`<=>` / IS NOT DISTINCT FROM): NULL keys
    match each other instead of vanishing — the semantics every warehouse
    reconciliation join over nullable dimensions needs (a plain equi-join
    silently drops the NULL group; an OR-isnull rewrite breaks hash
    planning).

    Spark plans `<=>` as a hash join key (NullSafeEqual is a valid
    equi-key), NOT a nested loop — same shuffle shape as `=`. The NULL
    group is materialized via NULLIF on the returnflag aggregate.
    """
    from ..tables import exact_sum

    li = load_table(spark, sf_dir, "lineitem")
    rf = F.nullif(F.col("l_returnflag"), F.lit("N")).alias("rf")
    a = li.groupBy(rf).agg(F.count(F.lit(1)).alias("n_lines"))
    b = li.groupBy(rf).agg(
        exact_sum(F.col("l_extendedprice"), 2).alias("revenue")
    )
    return a.join(b, a["rf"].eqNullSafe(b["rf"])).select(
        a["rf"], "n_lines", "revenue"
    )


BASKET_TOP_K = 25


@query(
    "q_basket_pairs",
    oracle=f"""
    WITH items AS (
        SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
    ), pairs AS (
        SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
               COUNT(*) AS support
        FROM items a JOIN items b ON a.l_orderkey = b.l_orderkey
        WHERE a.l_partkey < b.l_partkey
        GROUP BY 1, 2
    )
    SELECT part_a, part_b, support
    FROM pairs
    ORDER BY support DESC, part_a, part_b
    LIMIT {BASKET_TOP_K}
    """,
)
def q_basket_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket co-occurrence: the top-{BASKET_TOP_K} part pairs
    bought together in one order (frequent-itemset support counting, the
    association-mining primitive behind recommendations).

    Scale shape: the self-join key is l_orderkey and baskets are small
    (TPC-H ~7 lines/order), so per-key pair fan-out is bounded by
    basket_size² — NOT a quadratic blowup like a shingle join; the pair
    aggregate partial-combines map-side and the top-k plans as
    TakeOrderedAndProject (no global sort). A pathological mega-basket
    would need the same cap guard as the dedup tiers — TPC-H order shape
    makes it unnecessary here. (support DESC, part_a, part_b) is a total
    order, so the LIMIT boundary is deterministic cross-engine.
    """
    li = load_table(spark, sf_dir, "lineitem")
    items = li.select("l_orderkey", "l_partkey").distinct()
    a = items.select(
        "l_orderkey", F.col("l_partkey").alias("part_a")
    )
    b = items.select(
        "l_orderkey", F.col("l_partkey").alias("part_b")
    )
    return (
        a.join(b, "l_orderkey")
        .filter(F.col("part_a") < F.col("part_b"))
        .groupBy("part_a", "part_b")
        .agg(F.count(F.lit(1)).alias("support"))
        .orderBy(F.desc("support"), F.asc("part_a"), F.asc("part_b"))
        .limit(BASKET_TOP_K)
    )


@query(
    "q_basket_rules",
    oracle=f"""
    WITH items AS (
        SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
    ),
    pc AS (SELECT l_partkey, COUNT(*) AS cnt FROM items GROUP BY 1),
    nb AS (SELECT COUNT(DISTINCT l_orderkey) AS n FROM items),
    pairs AS (
        SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
               COUNT(*) AS support
        FROM items a JOIN items b USING (l_orderkey)
        WHERE a.l_partkey < b.l_partkey
        GROUP BY 1, 2
        ORDER BY support DESC, part_a, part_b
        LIMIT {BASKET_TOP_K}
    ),
    rules AS (
        SELECT part_a AS antecedent, part_b AS consequent, support
        FROM pairs
        UNION ALL
        SELECT part_b, part_a, support FROM pairs
    )
    SELECT antecedent, consequent, support,
           CAST(support * 1000000 // ac.cnt AS BIGINT) AS conf_ppm,
           CAST(support * nb.n * 1000000 // (ac.cnt * cc.cnt) AS BIGINT)
               AS lift_ppm
    FROM rules
    JOIN pc ac ON ac.l_partkey = antecedent
    JOIN pc cc ON cc.l_partkey = consequent, nb
    """,
)
def q_basket_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Association RULES over the top co-occurrence pairs: both directions
    A->B and B->A scored with confidence = P(B|A) and lift =
    P(A,B)/(P(A)P(B)) — the step after q_basket_pairs' support counting
    that recommendation pipelines actually rank by (high-support pairs of
    two independently-popular parts have lift ~1; a rule matters when
    lift >> 1).

    Determinism: ratios in integral ppm (support*1e6 div count — positive
    operands, floor in both engines); the pair selection inherits
    q_basket_pairs' total order, so the LIMIT boundary is stable.

    Scale shape: the pair join is the same bounded basket self-join;
    per-part counts are dimension-sized (broadcast), the basket total is
    ONE broadcast row, and the rule scoring is 2*K rows of arithmetic —
    everything after the support aggregate is driver-invisible and tiny.
    The distinct (order, part) item set feeds THREE consumers (pairs,
    per-part counts, basket total), so it is materialized once
    (localCheckpoint) instead of re-scanning the fact three times.
    """
    li = load_table(spark, sf_dir, "lineitem")
    items = (
        li.select("l_orderkey", "l_partkey")
        .distinct()
        .localCheckpoint(eager=True)
    )
    part_counts = items.groupBy("l_partkey").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    n_baskets = items.agg(
        F.count_distinct("l_orderkey").alias("n")
    )
    a = items.select("l_orderkey", F.col("l_partkey").alias("part_a"))
    b = items.select("l_orderkey", F.col("l_partkey").alias("part_b"))
    pairs = (
        a.join(b, "l_orderkey")
        .filter(F.col("part_a") < F.col("part_b"))
        .groupBy("part_a", "part_b")
        .agg(F.count(F.lit(1)).alias("support"))
        .orderBy(F.desc("support"), F.asc("part_a"), F.asc("part_b"))
        .limit(BASKET_TOP_K)
        # BOTH rule directions read this subtree; without a cut the
        # pair aggregation + top-K runs twice (AQE reuses the exchange
        # but not the final agg/limit — r12 optimization, measured one
        # duplicated multi-million-pair reduce). K rows, O(1) storage.
        .localCheckpoint(eager=True)
    )
    rules = pairs.select(
        F.col("part_a").alias("antecedent"),
        F.col("part_b").alias("consequent"),
        "support",
    ).unionByName(
        pairs.select(
            F.col("part_b").alias("antecedent"),
            F.col("part_a").alias("consequent"),
            "support",
        )
    )
    ac = part_counts.select(
        F.col("l_partkey").alias("antecedent"), F.col("cnt").alias("acnt")
    )
    cc = part_counts.select(
        F.col("l_partkey").alias("consequent"), F.col("cnt").alias("ccnt")
    )
    return (
        rules.join(F.broadcast(ac), "antecedent")
        .join(F.broadcast(cc), "consequent")
        .crossJoin(F.broadcast(n_baskets))
        .select(
            "antecedent",
            "consequent",
            "support",
            F.expr("support * 1000000 div acnt").alias("conf_ppm"),
            F.expr(
                "support * n * 1000000 div (acnt * ccnt)"
            ).alias("lift_ppm"),
        )
    )


BLOOM_M_BITS = 1 << 16  # 65536 bits = 1024 longs; ~10 bits/key at sf0.1
BLOOM_K = 3  # hash probes; fp ~ (1 - e^(-k*n/m))^k


def bloom_build(df, key: str):
    """Build a Bloom filter over ``df[key]`` as a Python list of
    ``BLOOM_M_BITS/64`` longs. All hashing is JVM-side (xxhash64 with a
    per-probe salt column — double-hashing via distinct seeds); the
    driver collects only the OR-folded bit words (<= 1024 rows, a
    constant independent of ``df``'s size — the same bounded-collect
    class as similarity.py's O(d^2) Gram fold)."""
    from pyspark.sql import functions as F

    positions = df.select(
        F.explode(
            F.array(
                *[
                    F.pmod(
                        F.xxhash64(F.col(key), F.lit(i)),
                        F.lit(BLOOM_M_BITS),
                    )
                    for i in range(BLOOM_K)
                ]
            )
        ).alias("p")
    )
    words = (
        positions.select(
            (F.col("p") / 64).cast("int").alias("w"),
            # F.shiftleft requires a PYTHON-int shift; the SQL builtin
            # takes a column
            F.expr(
                "shiftleft(CAST(1 AS BIGINT), CAST(p % 64 AS INT))"
            ).alias("m"),
        )
        .groupBy("w")
        .agg(F.bit_or("m").alias("bits"))
    )
    wmap = {r["w"]: r["bits"] for r in words.collect()}
    return [wmap.get(i, 0) for i in range(BLOOM_M_BITS >> 6)]


def bloom_might_contain(bloom_words: list, key: str):
    """Membership probe column for column name ``key``: true iff every
    one of the BLOOM_K bit positions is set in ``bloom_words`` (the
    word-list literal rides in the plan once, ~8 KB). Zero false
    negatives by construction; false positives are removed by the
    exact join that follows. The per-bit mask comes from a 64-entry
    lookup-array literal because the Python-API shift builtins only
    take constant shift amounts."""
    from functools import reduce as _reduce

    from pyspark.sql import functions as F

    arr = F.array(*[F.lit(x) for x in bloom_words])
    masks = F.array(
        *[
            F.lit((1 << b) - ((1 << 64) if b == 63 else 0)).cast("long")
            for b in range(64)
        ]
    )
    checks = []
    for i in range(BLOOM_K):
        p = F.pmod(
            F.xxhash64(F.col(key), F.lit(i)), F.lit(BLOOM_M_BITS)
        ).cast("int")
        w = F.floor(p / 64).cast("int")
        msk = F.element_at(masks, (p % 64).cast("int") + 1)
        checks.append(F.element_at(arr, w + 1).bitwiseAND(msk) != 0)
    return _reduce(lambda a, b: a & b, checks)


@query(
    "q_join_bloom_prefilter",
    oracle="""
    SELECT CAST(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 10000)
                         AS BIGINT)) AS DOUBLE) / 10000.0 AS revenue,
           COUNT(*) AS n_lines,
           CAST(COUNT(DISTINCT o_orderkey) AS BIGINT) AS n_orders
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    WHERE o_orderdate >= TIMESTAMP '1994-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1994-04-01 00:00:00'
    """,
)
def q_join_bloom_prefilter(spark, sf_dir: str):
    """BLOOM-FILTER SEMI-JOIN REDUCTION surfaced as a query — the
    physical rewrite proven row-invisible, the q_join_skew_salted
    pattern: the fact side (lineitem) is prefiltered by a Bloom filter
    built from the selective dimension's join keys (orders in one
    quarter, ~1/26 of the table) BEFORE the join, then the exact join
    removes the Bloom's false positives — so the result must equal the
    oracle's plain join, bit for bit. The filter itself is built with
    JVM-side expressions (xxhash64 double-hashing, bit_or word fold)
    and probes as a scan-stage row predicate; Spark 4 does not expose
    ``bloom_filter_agg`` to SQL, so this is the explicit spelling of
    the runtime-filter idiom.

    100 TB shape: when the dim-key set is too big to broadcast-join
    but its BLOOM (here 8 KB for ~10 bits/key) is not, the prefilter
    cuts the fact's shuffle volume by ~the dim's selectivity (1/26
    here, measured in tests) at the cost of one tiny aggregate — the
    classic semi-join reduction every distributed engine (and Spark's
    own runtime row-level filtering) applies, made available as an
    operator. Zero false negatives by construction (planted-membership
    pytest); fp rate bounded by (1-e^(-kn/m))^k.
    """
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    dim = o.filter(
        (F.col("o_orderdate") >= "1994-01-01")
        & (F.col("o_orderdate") < "1994-04-01")
    ).select("o_orderkey")
    bloom = bloom_build(dim, "o_orderkey")
    fact = li.select(
        "l_orderkey", "l_extendedprice", "l_discount"
    ).filter(bloom_might_contain(bloom, "l_orderkey"))
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return fact.join(
        dim, F.col("l_orderkey") == F.col("o_orderkey")
    ).agg(
        exact_sum(rev, 4).alias("revenue"),
        F.count(F.lit(1)).alias("n_lines"),
        F.countDistinct("o_orderkey").cast("bigint").alias("n_orders"),
    )


@query(
    "q_join_asof_nearest",
    oracle="""
    SELECT p.event_id, p.user_id,
           nb.event_id AS nb_event_id, nb.event_type AS nb_event_type,
           nb.dist_us
    FROM events p
    LEFT JOIN LATERAL (
        SELECT e.event_id, e.event_type,
               CAST(ABS(epoch_us(CAST(e.ts AS TIMESTAMP))
                        - epoch_us(CAST(p.ts AS TIMESTAMP))) AS BIGINT)
                   AS dist_us
        FROM events e
        WHERE e.user_id = p.user_id AND e.event_type <> 'purchase'
        ORDER BY ABS(epoch_us(CAST(e.ts AS TIMESTAMP))
                     - epoch_us(CAST(p.ts AS TIMESTAMP))) ASC,
                 e.ts ASC,
                 CASE WHEN e.ts <= p.ts THEN -e.event_id
                      ELSE e.event_id END ASC
        LIMIT 1
    ) nb ON true
    WHERE p.event_type = 'purchase'
    """,
)
def q_join_asof_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NEAREST as-of join: each purchase pairs with its closest-in-time
    non-purchase event of the same user, in EITHER direction — the
    'nearest' ASOF variant (pandas merge_asof direction='nearest';
    q_join_asof is the classic 'backward'). Tie at equal distance goes
    to the earlier (backward) candidate; equal-timestamp candidates
    count as backward at distance 0.

    Same scalable shape as q_join_asof — union + ONE user_id window
    partitioning (no pair blow-up): base rows sort BEFORE probes at
    equal ts (is_probe ASC), so ``last over rows(-inf, -1)`` is the
    backward candidate INCLUDING ties-at-zero and ``first over
    rows(+1, +inf)`` the forward one; the winner is a row-local
    comparison of the two distances. Tie orders are total in both
    engines (backward: max event_id; forward: min — the oracle's CASE
    key mirrors the two frames' traversal directions).
    """
    from ..tables import epoch_us

    ev = load_table(spark, sf_dir, "events")
    cols = ["user_id", "ts", "event_id", "event_type"]
    base = ev.filter(F.col("event_type") != "purchase").select(
        *cols, F.lit(0).alias("is_probe")
    )
    probe = ev.filter(F.col("event_type") == "purchase").select(
        *cols, F.lit(1).alias("is_probe")
    )
    u = base.unionByName(probe)
    order = [F.asc("ts"), F.asc("is_probe"), F.asc("event_id")]
    wback = (
        Window.partitionBy("user_id")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    wfwd = (
        Window.partitionBy("user_id")
        .orderBy(*order)
        .rowsBetween(1, Window.unboundedFollowing)
    )
    cand = F.when(
        F.col("is_probe") == 0,
        F.struct(
            F.col("event_id").alias("cid"),
            F.col("event_type").alias("ctype"),
            epoch_us("ts").alias("cus"),
        ),
    )
    u = (
        u.withColumn("back", F.last(cand, ignorenulls=True).over(wback))
        .withColumn("fwd", F.first(cand, ignorenulls=True).over(wfwd))
        .filter(F.col("is_probe") == 1)
        .withColumn("pus", epoch_us("ts"))
    )
    bdist = F.col("pus") - F.col("back.cus")
    fdist = F.col("fwd.cus") - F.col("pus")
    nearest = (
        F.when(F.col("back").isNull(), F.col("fwd"))
        .when(F.col("fwd").isNull(), F.col("back"))
        .when(bdist <= fdist, F.col("back"))
        .otherwise(F.col("fwd"))
    )
    return u.select(
        "event_id",
        "user_id",
        nearest["cid"].alias("nb_event_id"),
        nearest["ctype"].alias("nb_event_type"),
        F.abs(nearest["cus"] - F.col("pus")).cast("bigint").alias("dist_us"),
    )


ATTRIB_WINDOW_US = 24 * 3600 * 1_000_000  # 24h lookback


@query(
    "q_events_attribution",
    oracle=f"""
    WITH purch AS (
        SELECT event_id, user_id, ts, value FROM events
        WHERE event_type = 'purchase'
    ), credited AS (
        SELECT p.event_id, p.value,
               COALESCE(lt.event_type, 'organic') AS channel
        FROM purch p
        LEFT JOIN LATERAL (
            SELECT e.event_type
            FROM events e
            WHERE e.user_id = p.user_id
              AND e.event_type IN ('view', 'click')
              AND e.ts < p.ts
              AND epoch_us(CAST(p.ts AS TIMESTAMP))
                  - epoch_us(CAST(e.ts AS TIMESTAMP)) <= {ATTRIB_WINDOW_US}
            ORDER BY e.ts DESC, e.event_id DESC
            LIMIT 1
        ) lt ON true
    )
    SELECT channel,
           COUNT(*) AS n_purchases,
           CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS cents
    FROM credited
    GROUP BY channel
    """,
)
def q_events_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LAST-TOUCH attribution:every purchase credits the latest view/click
    by the same user within a 24h lookback (else 'organic') — the
    marketing-analytics credit assignment every events warehouse runs.

    Shape: the q_join_asof union-window rewrite with a FILTERED base
    (only touchpoint types enter the stream) and a window-bounded
    accept: one user_id shuffle, one sort, no per-purchase probe join.
    The 24h bound is checked AFTER the window picks the latest prior
    touchpoint — correct because last-touch wants the newest one only
    (an older in-window touchpoint must NOT be credited when the newest
    prior one is stale; the LATERAL oracle encodes the same rule).
    Sums are exact cents.
    """
    from ..tables import epoch_us

    ev = load_table(spark, sf_dir, "events")
    base = ev.filter(F.col("event_type").isin("view", "click")).select(
        "user_id", "ts", "event_id",
        F.col("event_type").alias("touch"),
        F.lit(None).cast("double").alias("value"),
        F.lit(0).alias("is_probe"),
    )
    probe = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", "event_id",
        F.lit(None).cast("string").alias("touch"),
        "value",
        F.lit(1).alias("is_probe"),
    )
    u = base.unionByName(probe)
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.asc("ts"), F.desc("is_probe"), F.asc("event_id"))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    last_touch = F.last(
        F.when(
            F.col("is_probe") == 0,
            F.struct(
                F.col("touch").alias("t"),
                epoch_us("ts").alias("tus"),
            ),
        ),
        ignorenulls=True,
    ).over(w)
    credited = (
        u.withColumn("lt", last_touch)
        .filter(F.col("is_probe") == 1)
        .select(
            "value",
            F.when(
                F.col("lt").isNotNull()
                & (
                    epoch_us("ts") - F.col("lt.tus")
                    <= ATTRIB_WINDOW_US
                ),
                F.col("lt.t"),
            )
            .otherwise(F.lit("organic"))
            .alias("channel"),
        )
    )
    return credited.groupBy("channel").agg(
        F.count(F.lit(1)).alias("n_purchases"),
        F.sum(F.round(F.col("value") * 100).cast("bigint")).alias("cents"),
    )
