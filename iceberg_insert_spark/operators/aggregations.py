"""Aggregation operators (SURVEY.md §2.4).

Spark hash aggregation is automatically partial+final (map-side combine before
the shuffle), so the groupBy queries here shuffle pre-aggregated data only.
Floating-point sums/avgs are rounded identically in the DataFrame code and the
oracle SQL: summation order differs across engines, so unrounded doubles can
differ in the last ulp (SURVEY.md §7 hard-part d).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..tables import tiny_df

from ..registry import query
from ..tables import exact_sum, load_table


@query(
    "q_agg_global",
    oracle="""
    SELECT COUNT(*) AS n_rows,
           ROUND(SUM(l_quantity), 2) AS sum_qty,
           CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS DOUBLE)
               / 100.0 / COUNT(*) AS avg_price,
           MIN(l_extendedprice) AS min_price,
           MAX(l_extendedprice) AS max_price,
           COUNT(DISTINCT l_suppkey) AS n_supp
    FROM lineitem
    """,
)
def q_agg_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ungrouped multi-aggregate over lineitem.

    Money averages use the exact fixed-point sum / count form (see
    tables.exact_sum): a double sum's last ulp depends on partition merge
    order (r01 q_agg_conditional driver divergence); a long cents sum is
    exact and order-independent, so sum-then-divide is bit-identical in
    both engines at any core count."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        (exact_sum(F.col("l_extendedprice")) / F.count(F.lit(1))).alias(
            "avg_price"
        ),
        F.min("l_extendedprice").alias("min_price"),
        F.max("l_extendedprice").alias("max_price"),
        F.countDistinct("l_suppkey").alias("n_supp"),
    )


@query(
    "q_agg_groupby",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           ROUND(SUM(l_quantity), 2) AS sum_qty,
           CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS DOUBLE)
               / 100.0 AS sum_base_price,
           CAST(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 10000)
                         AS BIGINT)) AS DOUBLE) / 10000.0 AS sum_disc_price,
           CAST(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount)
                               * (1 + l_tax) * 1000000)
                         AS BIGINT)) AS DOUBLE) / 1000000.0 AS sum_charge,
           ROUND(AVG(l_quantity), 4) AS avg_qty,
           CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS DOUBLE)
               / 100.0 / COUNT(*) AS avg_price,
           CAST(SUM(CAST(ROUND(l_discount * 100) AS BIGINT)) AS DOUBLE)
               / 100.0 / COUNT(*) AS avg_disc,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2001-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q_agg_groupby(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: grouped multi-aggregate (partial+final hash agg).

    All money sums use exact fixed-point LONG accumulation in BOTH engines
    (tables.exact_sum): double addition is not associative, so a double
    sum's last ulp depends on partition merge order (the r01
    q_agg_conditional driver divergence at local[32]); long sums are exact,
    order-independent, and stay in whole-stage codegen (2.2x faster than
    the >18-precision decimal sum). The per-row products have <= 4
    (price*disc) and <= 6 (*tax) true decimal digits, so the fixed-point
    rounding loses nothing. sum_qty stays double: l_quantity is integral,
    hence already exact.
    """
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") <= F.lit("2001-09-02 00:00:00").cast("timestamp_ntz")
    )
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    n = F.count(F.lit(1))
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        exact_sum(F.col("l_extendedprice")).alias("sum_base_price"),
        exact_sum(disc_price, 4).alias("sum_disc_price"),
        exact_sum(disc_price * (1 + F.col("l_tax")), 6).alias("sum_charge"),
        F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
        (exact_sum(F.col("l_extendedprice")) / n).alias("avg_price"),
        (exact_sum(F.col("l_discount")) / n).alias("avg_disc"),
        F.count(F.lit(1)).alias("count_order"),
    )


@query(
    "q_agg_distinct",
    oracle="""
    SELECT o_orderpriority,
           COUNT(DISTINCT o_custkey) AS n_cust,
           COUNT(*) AS n_orders
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def q_agg_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COUNT(DISTINCT) per group (expand + two-phase agg under the hood)."""
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.countDistinct("o_custkey").alias("n_cust"),
        F.count(F.lit(1)).alias("n_orders"),
    )


@query("q_agg_approx_distinct")
def q_agg_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL++ approximate distinct (rows-only check: approx != exact oracle).

    At 100 TB this replaces exact COUNT(DISTINCT) wherever a 1-2% error is
    acceptable — it is a single-pass, fixed-memory sketch with map-side merge.
    """
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.approx_count_distinct("o_custkey", rsd=0.02).alias("approx_cust"),
        F.count(F.lit(1)).alias("n_orders"),
    )


@query(
    "q_agg_rollup",
    oracle="""
    SELECT c_mktsegment, c_nationkey,
           COUNT(*) AS n_cust,
           CAST(SUM(CAST(ROUND(c_acctbal * 100) AS BIGINT)) AS DOUBLE)
               / 100.0 AS sum_bal
    FROM customer
    GROUP BY ROLLUP (c_mktsegment, c_nationkey)
    """,
)
def q_agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP hierarchy totals; grouping columns are non-null in the data so
    the NULL placeholder rows are unambiguous (SURVEY.md §7 hard-part b).
    Money sum in exact fixed-point: partition-order-independent (see
    tables.exact_sum)."""
    c = load_table(spark, sf_dir, "customer")
    return c.rollup("c_mktsegment", "c_nationkey").agg(
        F.count(F.lit(1)).alias("n_cust"),
        exact_sum(F.col("c_acctbal")).alias("sum_bal"),
    )


@query(
    "q_agg_cube",
    oracle="""
    SELECT o_orderstatus, o_orderpriority,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS DOUBLE)
               / 100.0 AS sum_price
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
)
def q_agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE: all grouping combinations in one pass. Money sum in exact
    fixed-point: partition-order-independent (see tables.exact_sum)."""
    o = load_table(spark, sf_dir, "orders")
    return o.cube("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        exact_sum(F.col("o_totalprice")).alias("sum_price"),
    )


@query(
    "q_agg_grouping_sets",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(GROUPING(l_returnflag) AS BIGINT) AS g_flag,
           CAST(GROUPING(l_linestatus) AS BIGINT) AS g_status,
           ROUND(SUM(l_quantity), 2) AS sum_qty,
           COUNT(*) AS n_rows
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
    """,
)
def q_agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS with GROUPING() markers to disambiguate the
    placeholder NULLs from data NULLs. View name is sf-scoped: a fixed name
    would race with concurrent callers on a shared session."""
    import re

    tag = re.sub(r"\W", "_", sf_dir.rstrip("/").split("/")[-1])
    view = f"_gs_lineitem__{tag}"
    li = load_table(spark, sf_dir, "lineitem")
    li.createOrReplaceTempView(view)
    return spark.sql(
        f"""
        SELECT l_returnflag, l_linestatus,
               CAST(GROUPING(l_returnflag) AS BIGINT) AS g_flag,
               CAST(GROUPING(l_linestatus) AS BIGINT) AS g_status,
               ROUND(SUM(l_quantity), 2) AS sum_qty,
               COUNT(*) AS n_rows
        FROM {view}
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        """
    )


@query(
    "q_agg_percentile",
    oracle="""
    SELECT l_returnflag,
           ROUND(QUANTILE_CONT(l_quantity, 0.5), 6) AS p50_qty,
           ROUND(QUANTILE_CONT(l_quantity, 0.9), 6) AS p90_qty,
           ROUND(QUANTILE_CONT(l_extendedprice, 0.5), 6) AS p50_price
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def q_agg_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles (Spark percentile == DuckDB
    QUANTILE_CONT, both linear interpolation). At 100 TB swap in
    approx_percentile — a fixed-memory mergeable sketch — wherever the exact
    sort-per-group cost isn't justified."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.percentile("l_quantity", F.lit(0.5)), 6).alias("p50_qty"),
        F.round(F.percentile("l_quantity", F.lit(0.9)), 6).alias("p90_qty"),
        F.round(F.percentile("l_extendedprice", F.lit(0.5)), 6).alias(
            "p50_price"
        ),
    )


@query(
    "q_agg_stats",
    oracle="""
    SELECT l_returnflag,
           ROUND(STDDEV_SAMP(l_quantity), 6) AS sd_qty,
           ROUND(VAR_SAMP(l_quantity), 6) AS var_qty,
           ROUND(CORR(l_quantity, l_extendedprice), 6) AS corr_qty_price,
           ROUND(COVAR_SAMP(l_quantity, l_discount), 6) AS cov_qty_disc
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def q_agg_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical aggregates (single-pass mergeable moments — map-side
    partials merge associatively, no extra shuffle vs plain SUM)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.stddev_samp("l_quantity"), 6).alias("sd_qty"),
        F.round(F.var_samp("l_quantity"), 6).alias("var_qty"),
        F.round(F.corr("l_quantity", "l_extendedprice"), 6).alias(
            "corr_qty_price"
        ),
        F.round(F.covar_samp("l_quantity", "l_discount"), 6).alias(
            "cov_qty_disc"
        ),
    )


@query(
    "q_agg_collect",
    oracle="""
    SELECT r_name,
           CAST(COUNT(*) AS BIGINT) AS n_nations,
           STRING_AGG(n_name, ',' ORDER BY n_name) AS nations_csv
    FROM region JOIN nation ON n_regionkey = r_regionkey
    GROUP BY r_name
    """,
)
def q_agg_collect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered list aggregation. collect_list's arrival order is
    partition-dependent, so a deterministic surface MUST sort the array —
    array_sort(collect_list()) is the engine-stable spelling of DuckDB's
    LIST(... ORDER BY). The array itself stays internal (the driver's
    canonicalizer cannot hash array cells — r01 finding); the oracle sees
    the sorted CSV + cardinality, and tests/test_oracle.py asserts the
    array contents via the csv round-trip."""
    r = load_table(spark, sf_dir, "region")
    n = load_table(spark, sf_dir, "nation")
    return (
        r.join(n, n.n_regionkey == r.r_regionkey)
        .groupBy("r_name")
        .agg(F.array_sort(F.collect_list("n_name")).alias("nations"))
        .select(
            "r_name",
            F.size("nations").cast("bigint").alias("n_nations"),
            F.concat_ws(",", "nations").alias("nations_csv"),
        )
    )


@query(
    "q_pivot",
    oracle="""
    SELECT c_mktsegment,
           COUNT(CASE WHEN o_orderstatus = 'O' THEN 1 END) AS status_o,
           COUNT(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS status_f,
           COUNT(CASE WHEN o_orderstatus = 'P' THEN 1 END) AS status_p
    FROM customer JOIN orders ON o_custkey = c_custkey
    GROUP BY c_mktsegment
    """,
)
def q_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot (long -> wide). Pinning the pivot values avoids the extra
    distinct-values job Spark otherwise runs before planning."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    piv = (
        c.join(o, o.o_custkey == c.c_custkey)
        .groupBy("c_mktsegment")
        .pivot("o_orderstatus", ["O", "F", "P"])
        .count()
    )
    return piv.select(
        "c_mktsegment",
        F.coalesce(F.col("O"), F.lit(0)).alias("status_o"),
        F.coalesce(F.col("F"), F.lit(0)).alias("status_f"),
        F.coalesce(F.col("P"), F.lit(0)).alias("status_p"),
    )


@query(
    "q_unpivot",
    oracle="""
    SELECT p_partkey, 'p_size' AS metric, CAST(p_size AS DOUBLE) AS value
    FROM part
    UNION ALL
    SELECT p_partkey, 'p_retailprice' AS metric, p_retailprice AS value
    FROM part
    """,
)
def q_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot (wide -> long): zero-shuffle narrow transform."""
    p = load_table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.col("p_size").cast("double").alias("p_size"),
        "p_retailprice",
    ).unpivot("p_partkey", ["p_size", "p_retailprice"], "metric", "value")


_MINMAX_KEY = "printf('%020.2f#%012d', o_totalprice, o_orderkey)"


@query(
    "q_agg_minmax_by",
    oracle=f"""
    SELECT o_orderstatus,
           ARG_MAX(o_orderkey, {_MINMAX_KEY}) AS biggest_order,
           ARG_MIN(o_orderkey, {_MINMAX_KEY}) AS smallest_order,
           ROUND(MAX(o_totalprice), 2) AS max_price
    FROM orders
    GROUP BY o_orderstatus
    """,
)
def q_agg_minmax_by(spark: SparkSession, sf_dir: str) -> DataFrame:
    """max_by/min_by (argmax) per group. Both engines leave argmax ties
    unspecified, so the ordering key is a zero-padded composite
    (price, orderkey) string — total order, engine-stable result."""
    o = load_table(spark, sf_dir, "orders")
    key = F.format_string("%020.2f#%012d", "o_totalprice", "o_orderkey")
    return o.groupBy("o_orderstatus").agg(
        F.max_by("o_orderkey", key).alias("biggest_order"),
        F.min_by("o_orderkey", key).alias("smallest_order"),
        F.round(F.max("o_totalprice"), 2).alias("max_price"),
    )


@query(
    "q_agg_conditional",
    oracle="""
    SELECT o_orderpriority,
           CAST(COUNT_IF(o_totalprice > 100000) AS BIGINT) AS n_big,
           BOOL_AND(o_totalprice > 0) AS all_positive,
           BOOL_OR(o_orderstatus = 'P') AS any_pending,
           CAST(SUM(CAST(ROUND(CASE WHEN o_orderstatus = 'F'
                                    THEN o_totalprice ELSE 0.0 END * 100)
                         AS BIGINT)) AS DOUBLE) / 100.0 AS f_revenue
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def q_agg_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional aggregates: count_if / bool_and / bool_or / filtered sum —
    single-pass predicates folded into the partial aggregate (no pre-filter
    pass over the fact table).

    The filtered sum uses exact fixed-point accumulation in BOTH engines
    (tables.exact_sum): a double sum is partition-order-dependent in its
    last ulp — THE r01 driver divergence at local[32] — while a long cents
    sum is exact regardless of core count."""
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.count_if(F.col("o_totalprice") > 100000).alias("n_big"),
        F.bool_and(F.col("o_totalprice") > 0).alias("all_positive"),
        F.bool_or(F.col("o_orderstatus") == "P").alias("any_pending"),
        exact_sum(
            F.when(F.col("o_orderstatus") == "F", F.col("o_totalprice"))
            .otherwise(F.lit(0.0))
        ).alias("f_revenue"),
    )


@query(
    "q_agg_histogram",
    oracle="""
    SELECT CAST(FLOOR(20.0 * o_totalprice / 500000.0) + 1 AS BIGINT)
               AS bucket,
           COUNT(*) AS n_orders,
           ROUND(MIN(o_totalprice), 2) AS lo,
           ROUND(MAX(o_totalprice), 2) AS hi
    FROM orders
    GROUP BY 1
    """,
)
def q_agg_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-width histogram via width_bucket — the one-pass distribution
    profile (vs exact percentiles' sort-per-group). DuckDB has no
    width_bucket, so the twin spells out Spark's internal formula
    floor(n*(x-min)/(max-min))+1 — same float ops, same binning; all
    o_totalprice values are interior to [0, 500000) so the under/overflow
    buckets (0 and n+1) never appear."""
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy(
        F.width_bucket("o_totalprice", F.lit(0.0), F.lit(500000.0), F.lit(20))
        .cast("bigint")
        .alias("bucket")
    ).agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.round(F.min("o_totalprice"), 2).alias("lo"),
        F.round(F.max("o_totalprice"), 2).alias("hi"),
    )


RETENTION_WEEK_US = 7 * 86_400 * 1_000_000


@query(
    "q_events_retention",
    oracle=f"""
    WITH signup AS (
        SELECT user_id, MIN(epoch_us(CAST(ts AS TIMESTAMP))) AS su_us
        FROM events WHERE event_type = 'signup' GROUP BY user_id
    ), activity AS (
        SELECT DISTINCT e.user_id,
               s.su_us // {RETENTION_WEEK_US} AS cohort_week,
               (epoch_us(CAST(e.ts AS TIMESTAMP)) - s.su_us)
                   // {RETENTION_WEEK_US} AS week_offset
        FROM events e JOIN signup s ON e.user_id = s.user_id
        WHERE epoch_us(CAST(e.ts AS TIMESTAMP)) >= s.su_us
    )
    SELECT cohort_week, week_offset, COUNT(*) AS n_users
    FROM activity GROUP BY cohort_week, week_offset
    """,
)
def q_events_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention: users bucketed by signup week, counted once per
    later week they were active in — the standard product-analytics triangle
    (cohort_week x week_offset x retained users).

    All week math is integer microseconds-since-epoch floor-division
    (`div` / `//`), exact and identical in both engines — no calendar
    functions whose week-start conventions could diverge. Shuffle profile:
    signup-time agg combines map-side to one row per signing-up user; the
    events-x-signup join shuffles on user_id (the signup side is a SUBSET of
    the user dimension — potentially billions at 100 TB, so no broadcast
    pin; AQE may still choose one when it fits); the per-user dedup reuses
    that same user_id clustering before the final tiny (cohort, offset)
    exchange."""
    from ..tables import epoch_us

    ev = load_table(spark, sf_dir, "events")
    su = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min(epoch_us("ts")).alias("su_us"))
    )
    act = (
        ev.select("user_id", epoch_us("ts").alias("t_us"))
        .join(su, "user_id")
        .filter(F.col("t_us") >= F.col("su_us"))
        .select(
            "user_id",
            # FLOOR division, not `div` (truncate-toward-zero): the DuckDB
            # twin's `//` floors, and a pre-1970 signup makes su_us negative.
            # Subtracting pmod makes the dividend an exact multiple, so `div`
            # equals floor with no double-precision round trip.
            F.expr(
                f"(su_us - pmod(su_us, {RETENTION_WEEK_US}))"
                f" div {RETENTION_WEEK_US}"
            ).alias("cohort_week"),
            F.expr(
                f"(t_us - su_us - pmod(t_us - su_us, {RETENTION_WEEK_US}))"
                f" div {RETENTION_WEEK_US}"
            ).alias("week_offset"),
        )
        .distinct()
    )
    return act.groupBy("cohort_week", "week_offset").agg(
        F.count(F.lit(1)).alias("n_users")
    )


@query("q_agg_percentile_approx")
def q_agg_percentile_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch-tier percentiles: approx_percentile with accuracy 10000 — the
    fixed-memory mergeable-sketch answer when q_agg_percentile's exact
    sort-per-group isn't justified at 100 TB. Rows-only: sketch internals
    (and therefore last-digit estimates) are engine-specific; the exact
    twin above carries the oracle."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.approx_percentile("l_quantity", F.lit(0.5), F.lit(10000)).alias(
            "p50_qty"
        ),
        F.approx_percentile("l_quantity", F.lit(0.9), F.lit(10000)).alias(
            "p90_qty"
        ),
        F.approx_percentile(
            "l_extendedprice", F.lit(0.5), F.lit(10000)
        ).alias("p50_price"),
    )


PROFILE_COLS = [
    "o_orderkey",
    "o_custkey",
    "o_orderstatus",
    "o_totalprice",
    "o_orderdate",
    "o_orderpriority",
]


@query(
    "q_profile_table",
    oracle=" UNION ALL ".join(
        f"""
        SELECT '{c}' AS column_name,
               CAST(SUM(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_nulls,
               CAST(COUNT(DISTINCT {c}) AS BIGINT) AS n_distinct
        FROM orders
        """
        for c in PROFILE_COLS
    ),
)
def q_profile_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-profiling pass: per-column null count + distinct cardinality in
    ONE scan — the dbt-utils/Deequ-style quality primitive that gates
    ingestion at 100 TB (a column whose null fraction jumps is a broken
    upstream).

    One aggregate row computes all 2x|cols| stats (single scan, map-side
    partials — count_distinct becomes per-column expand+partial, still one
    pass over the parquet), then a stack() pivots the row into the
    (column_name, n_nulls, n_distinct) profile. The oracle scans once per
    column; ours scans once total."""
    o = load_table(spark, sf_dir, "orders")
    agg = o.agg(
        *[
            F.sum(F.col(c).isNull().cast("bigint")).alias(f"n_{c}")
            for c in PROFILE_COLS
        ],
        *[F.count_distinct(F.col(c)).alias(f"d_{c}") for c in PROFILE_COLS],
    )
    stack_args = ", ".join(
        f"'{c}', n_{c}, d_{c}" for c in PROFILE_COLS
    )
    return agg.select(
        F.expr(
            f"stack({len(PROFILE_COLS)}, {stack_args})"
            " as (column_name, n_nulls, n_distinct)"
        )
    )


@query("q_events_hll_daily")
def q_events_hll_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable-sketch rollup: per-day HLL sketches of distinct users,
    UNION-merged into the month WITHOUT re-scanning events — the
    pre-aggregation pattern that makes 100 TB dashboards possible (store
    KB-sized sketches per grain; answer any coarser-grain distinct query
    by merging sketches, never by re-reading the fact table; exact distinct
    counts do NOT compose this way).

    Output: one row per day (daily estimate) plus a month row whose
    estimate comes ONLY from merging the daily sketches. Rows-only (HLL
    estimates are engine-specific); tests/test_properties.py pins the
    estimates to within 5% of exact and the merge to >= the max daily."""
    from ..tables import load_table as _lt

    ev = _lt(spark, sf_dir, "events")
    daily = (
        ev.groupBy(F.date_trunc("day", "ts").alias("day"))
        .agg(F.hll_sketch_agg("user_id").alias("sk"))
        .localCheckpoint(eager=True)  # sketches computed once, reused twice
    )
    per_day = daily.select(
        F.date_format("day", "yyyy-MM-dd").alias("grain"),
        F.hll_sketch_estimate("sk").alias("approx_users"),
    )
    month = daily.agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("approx_users")
    ).select(F.lit("MONTH").alias("grain"), "approx_users")
    return per_day.unionByName(month)


@query(
    "q_events_bitmap_distinct",
    oracle="""
    SELECT STRFTIME(ts, '%Y-%m') AS month,
           COUNT(DISTINCT user_id) AS n_users
    FROM events GROUP BY 1
    """,
)
def q_events_bitmap_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT mergeable distinct counting via Spark 4 bitmap aggregates —
    the precise counterpart of q_events_hll_daily's approximate rollup:
    per-day bitmaps of user_ids (one 4KB bitmap per 32768-id bucket) are
    OR-merged into months, and the monthly distinct count is the sum of
    per-bucket bit counts — bit-exact, oracled against COUNT(DISTINCT).

    Why this matters at 100 TB: COUNT(DISTINCT) re-shuffles the raw id
    stream for every grain you report; bitmap partials are tiny, mergeable
    like HLL sketches (a day's bitmaps fold into months/quarters WITHOUT
    rescanning the fact table), but with zero error. The bucket split
    (id div 32768) keeps each bitmap bounded regardless of id range, and
    distinct ids partition cleanly across buckets so per-bucket counts add
    exactly. Three cheap stages: day+bucket construct (map-side partials),
    month+bucket OR-merge, month sum.
    """
    ev = load_table(spark, sf_dir, "events")
    base = ev.select(
        F.date_format("ts", "yyyy-MM").alias("month"),
        F.date_format("ts", "yyyy-MM-dd").alias("day"),
        "user_id",
    )
    daily = base.groupBy(
        "month", "day", F.bitmap_bucket_number("user_id").alias("bucket")
    ).agg(
        F.bitmap_construct_agg(F.bitmap_bit_position("user_id")).alias("bm")
    )
    monthly = daily.groupBy("month", "bucket").agg(
        F.bitmap_or_agg("bm").alias("bm")
    )
    return monthly.groupBy("month").agg(
        F.sum(F.bitmap_count("bm")).alias("n_users")
    )


@query(
    "q_events_anomaly_mad",
    oracle="""
    WITH cents AS (
        SELECT event_type, event_id,
               CAST(ROUND(value * 100) AS BIGINT) AS v
        FROM events
    ), med AS (
        SELECT event_type, QUANTILE_CONT(v, 0.5) AS med_v
        FROM cents GROUP BY event_type
    ), dev AS (
        SELECT c.event_type, c.event_id, c.v, m.med_v,
               ABS(c.v - m.med_v) AS adev
        FROM cents c JOIN med m ON c.event_type = m.event_type
    ), mad AS (
        SELECT event_type, QUANTILE_CONT(adev, 0.5) AS mad_v
        FROM dev GROUP BY event_type
    )
    SELECT d.event_type,
           ROUND(d.med_v / 100.0, 6) AS median_value,
           ROUND(m.mad_v / 100.0, 6) AS mad_value,
           COUNT(*) AS n_events,
           COUNT(CASE WHEN d.adev > 3 * m.mad_v THEN 1 END) AS n_outliers
    FROM dev d JOIN mad m ON d.event_type = m.event_type
    GROUP BY d.event_type, d.med_v, m.mad_v
    """,
)
def q_events_anomaly_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust outlier detection per event type: median + MAD (median
    absolute deviation) and the count of events beyond 3 MADs — the
    standard anomaly gate that, unlike mean/stddev z-scores, is not itself
    dragged by the outliers it hunts.

    Determinism: values quantize to integer cents FIRST, so both medians
    interpolate between integers — the result is an exact x.0/x.5 double in
    both engines (Spark percentile == DuckDB QUANTILE_CONT, linear
    interpolation) and the 3-MAD threshold compare is exact.

    Scale shape: two grouped exact percentiles (sort-per-group on the
    low-cardinality event_type key) + one broadcast-sized stats join back.
    At 100 TB swap approx_percentile into the same plan
    (q_agg_percentile_approx pattern) — the MAD gate math is unchanged.
    """
    ev = load_table(spark, sf_dir, "events")
    cents = ev.select(
        "event_type",
        "event_id",
        F.round(F.col("value") * 100).cast("bigint").alias("v"),
    )
    med = cents.groupBy("event_type").agg(
        F.percentile("v", F.lit(0.5)).alias("med_v")
    )
    dev = cents.join(F.broadcast(med), "event_type").withColumn(
        "adev", F.abs(F.col("v") - F.col("med_v"))
    )
    mad = dev.groupBy("event_type").agg(
        F.percentile("adev", F.lit(0.5)).alias("mad_v")
    )
    return (
        dev.join(F.broadcast(mad), "event_type")
        .groupBy("event_type", "med_v", "mad_v")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.count(
                F.when(F.col("adev") > 3 * F.col("mad_v"), 1)
            ).alias("n_outliers"),
        )
        .select(
            "event_type",
            F.round(F.col("med_v") / 100.0, 6).alias("median_value"),
            F.round(F.col("mad_v") / 100.0, 6).alias("mad_value"),
            "n_events",
            "n_outliers",
        )
    )


@query(
    "q_events_wau",
    oracle="""
    WITH ud AS (
        SELECT DISTINCT CAST(ts AS DATE) AS d, user_id FROM events
    ), days AS (SELECT DISTINCT d FROM ud)
    SELECT STRFTIME(days.d, '%Y-%m-%d') AS day,
           COUNT(DISTINCT ud.user_id) AS wau
    FROM days JOIN ud ON ud.d BETWEEN days.d - 6 AND days.d
    GROUP BY 1
    """,
)
def q_events_wau(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-7-day active users per day (WAU — the DAU/WAU/MAU
    engagement family): for each observed day, distinct users active in
    [day-6, day].

    Scale shape: a window COUNT(DISTINCT) doesn't exist, and the naive
    days x users range join is O(days * activity). The scalable rewrite:
    dedup to (user, day) once, EXPLODE each activity into its 7
    contribution days (a constant x7 narrow map, no shuffle), semi-join
    against the observed-day set (broadcast, |days| rows), then one
    distinct-count shuffle keyed by day. Work is O(activity x window/day
    granularity) regardless of user count — the standard engagement-metric
    shape at fleet scale.
    """
    ev = load_table(spark, sf_dir, "events")
    # the (user, day) dedup feeds multiple consumers (day grid, per-day
    # count, contribution explode) — materialized once so the event scan
    # + distinct shuffle don't compile per consumer (round-5 scan audit)
    ud = (
        ev.select(F.col("ts").cast("date").alias("d"), "user_id")
        .distinct()
        .localCheckpoint(eager=True)
    )
    days = ud.select("d").distinct().select(F.col("d").alias("day"))
    contrib = ud.select(
        "user_id",
        F.explode(
            F.expr("transform(sequence(0, 6), i -> date_add(d, i))")
        ).alias("day"),
    )
    return (
        contrib.join(F.broadcast(days), "day")
        .groupBy(F.date_format("day", "yyyy-MM-dd").alias("day"))
        .agg(F.countDistinct("user_id").alias("wau"))
    )


PARETO_PARTITIONS = 16


@query(
    "q_lineitem_pareto",
    oracle="""
    WITH rev AS (
        SELECT l_partkey,
               CAST(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 100)
                             AS BIGINT)) AS BIGINT) AS cents
        FROM lineitem GROUP BY l_partkey
    ), tot AS (SELECT CAST(SUM(cents) AS BIGINT) AS total FROM rev),
    c AS (
        SELECT l_partkey, cents,
               CAST(SUM(cents) OVER (
                        ORDER BY cents DESC, l_partkey
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                    AS BIGINT) AS cum
        FROM rev
    )
    SELECT l_partkey,
           CAST(cents AS DOUBLE) / 100.0 AS revenue,
           CAST(CAST(cum AS HUGEINT) * 1000000 // total AS BIGINT)
               AS cum_share_ppm,
           CASE WHEN CAST(CAST(cum AS HUGEINT) * 1000000 // total AS BIGINT)
                     <= 700000 THEN 'A'
                WHEN CAST(CAST(cum AS HUGEINT) * 1000000 // total AS BIGINT)
                     <= 950000 THEN 'B'
                ELSE 'C' END AS abc_class
    FROM c, tot
    """,
)
def q_lineitem_pareto(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pareto / ABC analysis: rank parts by revenue, attach each part's
    CUMULATIVE revenue share, and classify A (top 70% of revenue),
    B (to 95%), C (tail) — the inventory-analytics classic, and the
    canonical global-cumulative-sum shape.

    Scale shape: the naive spelling is one window over a global ORDER BY —
    a single-partition sort of the whole aggregate. This implementation
    uses the two-pass zipWithIndex pattern (q_docs_shuffle's): range-
    repartition the per-part aggregate on the rank key, running-sum
    WITHIN each sorted partition (parallel windows), then add per-
    partition offsets from a PARETO_PARTITIONS-row driver table — the
    global cumsum without a global sort. Determinism: revenue is exact
    cents; the rank order (cents DESC, partkey) is total; the share is
    integral ppm division (DECIMAL(38)-widened — a 100 TB revenue total
    times 1e6 clears BIGINT); class boundaries compare exact integers.
    """
    from pyspark.sql import Window

    from ..tables import ranged_offsets

    li = load_table(spark, sf_dir, "lineitem")
    cents = F.round(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100
    ).cast("bigint")
    rev = li.groupBy("l_partkey").agg(F.sum(cents).alias("cents"))
    ordered, total = ranged_offsets(
        rev,
        PARETO_PARTITIONS,
        [F.desc("cents"), F.asc("l_partkey")],
        weight="cents",
    )
    w = (
        Window.partitionBy("_pid")
        .orderBy(F.desc("cents"), F.asc("l_partkey"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    share = F.expr(
        f"CAST(CAST(cum AS DECIMAL(38,0)) * 1000000 div {total}L AS BIGINT)"
    )
    return (
        ordered
        .select(
            "l_partkey",
            (F.col("cents").cast("double") / 100.0).alias("revenue"),
            (F.sum("cents").over(w) + F.col("_off")).alias("cum"),
        )
        .select(
            "l_partkey",
            "revenue",
            share.alias("cum_share_ppm"),
            F.when(share <= 700000, "A")
            .when(share <= 950000, "B")
            .otherwise("C")
            .alias("abc_class"),
        )
    )


@query(
    "q_events_dau_mau",
    oracle="""
    WITH ud AS (
        SELECT DISTINCT CAST(ts AS DATE) AS d, user_id FROM events
    ), days AS (SELECT DISTINCT d FROM ud),
    dau AS (SELECT d, COUNT(DISTINCT user_id) AS dau FROM ud GROUP BY 1),
    mau AS (
        SELECT days.d, COUNT(DISTINCT ud.user_id) AS mau
        FROM days JOIN ud ON ud.d BETWEEN days.d - 29 AND days.d
        GROUP BY 1
    )
    SELECT STRFTIME(days.d, '%Y-%m-%d') AS day, dau.dau, mau.mau,
           CAST(dau.dau * 1000000 // mau.mau AS BIGINT) AS stickiness_ppm
    FROM days JOIN dau ON dau.d = days.d JOIN mau ON mau.d = days.d
    """,
)
def q_events_dau_mau(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DAU + trailing-30-day MAU + the DAU/MAU stickiness ratio per day —
    the other two thirds of the DAU/WAU/MAU engagement family
    (q_events_wau is the 7-day sibling).

    Scale shape: same explode-contribution rewrite as WAU — dedup to
    (user, day) once, explode each activity into its 30 contribution days
    (constant x30 narrow map, no shuffle), semi-join the observed-day set
    (broadcast), one distinct-count shuffle keyed by day; DAU reuses the
    same (user, day) dedup with a plain per-day distinct count. Work is
    O(activity x 30), independent of user count. Stickiness is ppm
    integral division on positive longs (Spark `div` trunc == DuckDB `//`
    floor for positive operands).
    """
    ev = load_table(spark, sf_dir, "events")
    # the (user, day) dedup feeds multiple consumers (day grid, per-day
    # count, contribution explode) — materialized once so the event scan
    # + distinct shuffle don't compile per consumer (round-5 scan audit)
    ud = (
        ev.select(F.col("ts").cast("date").alias("d"), "user_id")
        .distinct()
        .localCheckpoint(eager=True)
    )
    days = ud.select("d").distinct().select(F.col("d").alias("day"))
    dau = (
        ud.groupBy(F.col("d").alias("day"))
        .agg(F.countDistinct("user_id").alias("dau"))
    )
    contrib = ud.select(
        "user_id",
        F.explode(
            F.expr("transform(sequence(0, 29), i -> date_add(d, i))")
        ).alias("day"),
    )
    mau = (
        contrib.join(F.broadcast(days), "day")
        .groupBy("day")
        .agg(F.countDistinct("user_id").alias("mau"))
    )
    return (
        dau.join(mau, "day")
        .select(
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            "dau",
            "mau",
            F.expr("dau * 1000000 div mau").alias("stickiness_ppm"),
        )
    )


@query(
    "q_nation_revenue_yoy",
    oracle="""
    WITH r AS (
        SELECT n_name AS nation, YEAR(o_orderdate) AS yr,
               CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))
                    AS BIGINT) AS cents
        FROM orders
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        GROUP BY 1, 2
    ), lagged AS (
        SELECT nation, yr, cents,
               LAG(cents) OVER (PARTITION BY nation ORDER BY yr) AS prev,
               LAG(yr) OVER (PARTITION BY nation ORDER BY yr) AS prev_yr
        FROM r
    )
    SELECT nation, yr,
           CAST(cents AS DOUBLE) / 100.0 AS revenue,
           CAST(CASE WHEN prev_yr = yr - 1 AND prev > 0
                     THEN CAST(CAST(cents AS HUGEINT) * 1000000 // prev
                               AS BIGINT) - 1000000
                     END AS BIGINT) AS yoy_growth_ppm
    FROM lagged
    """,
)
def q_nation_revenue_yoy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Year-over-year revenue growth per customer nation — the
    lag-on-aggregate growth-rate shape (NULL when the prior YEAR is
    missing, not just the prior row: a gap year must not masquerade as
    one year's growth).

    Determinism: growth is computed as cents*1e6 div prev MINUS 1e6 —
    algebraically floor((cents-prev)*1e6/prev), but spelled with a
    POSITIVE numerator so Spark's truncating `div` equals DuckDB's
    flooring `//` even when revenue shrank (a direct (cents-prev)
    numerator goes negative exactly when growth is negative — the
    operands-sign trap). The 1e6 multiply widens (HUGEINT/DECIMAL(38))
    before the division. Scale shape: one custkey shuffle for the join,
    nation broadcast, then the lag window runs over the
    |nations x years|-row aggregate — O(hundreds), never the fact table.
    """
    from pyspark.sql import Window

    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey"
    )
    n = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", F.col("n_name").alias("nation")
    )
    r = (
        o.join(c, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("nation", F.year("o_orderdate").cast("bigint").alias("yr"))
        .agg(
            F.sum(
                F.round(F.col("o_totalprice") * 100).cast("bigint")
            ).alias("cents")
        )
    )
    w = Window.partitionBy("nation").orderBy("yr")
    lagged = r.select(
        "nation",
        "yr",
        "cents",
        F.lag("cents").over(w).alias("prev"),
        F.lag("yr").over(w).alias("prev_yr"),
    )
    return lagged.select(
        "nation",
        "yr",
        (F.col("cents").cast("double") / 100.0).alias("revenue"),
        F.when(
            (F.col("prev_yr") == F.col("yr") - 1) & (F.col("prev") > 0),
            F.expr(
                "CAST(CAST(cents AS DECIMAL(38,0)) * 1000000 div prev"
                " AS BIGINT) - 1000000"
            ),
        ).cast("bigint").alias("yoy_growth_ppm"),
    )


@query(
    "q_events_cumulative_users",
    oracle="""
    WITH fs AS (
        SELECT user_id, MIN(CAST(ts AS DATE)) AS first_d
        FROM events GROUP BY user_id
    ), daily AS (
        SELECT first_d AS d, COUNT(*) AS new_users FROM fs GROUP BY first_d
    )
    SELECT STRFTIME(d, '%Y-%m-%d') AS day, new_users,
           CAST(SUM(new_users) OVER (
                    ORDER BY d
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS BIGINT) AS cum_users
    FROM daily
    """,
)
def q_events_cumulative_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """User-acquisition curve: per day, how many users were seen for the
    FIRST time, and the running total of distinct users ever seen — the
    growth-accounting companion of DAU/WAU/MAU (a running COUNT(DISTINCT)
    window, which engines don't support, rewritten as first-seen flags).

    Scale shape: the first-seen date is one user-keyed aggregate over the
    corpus (map-side partials); everything after runs on the |days|-row
    daily aggregate — the global cumsum window orders ~tens of rows, so
    unlike q_lineitem_pareto no offset machinery is needed (the
    single-partition window is over O(days), never O(corpus)).
    """
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    fs = ev.groupBy("user_id").agg(
        F.min(F.col("ts").cast("date")).alias("first_d")
    )
    daily = fs.groupBy(F.col("first_d").alias("d")).agg(
        F.count(F.lit(1)).alias("new_users")
    )
    w = Window.orderBy("d").rowsBetween(Window.unboundedPreceding, 0)
    return daily.select(
        F.date_format("d", "yyyy-MM-dd").alias("day"),
        "new_users",
        F.sum("new_users").over(w).alias("cum_users"),
    )


@query(
    "q_customer_rfm",
    oracle="""
    WITH mx AS (SELECT MAX(o_orderdate) AS max_d FROM orders),
    base AS (
        SELECT o_custkey AS c_custkey,
               CAST(DATE_DIFF('day', CAST(MAX(o_orderdate) AS DATE),
                              CAST(max_d AS DATE)) AS BIGINT) AS recency_days,
               COUNT(*) AS frequency,
               CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))
                    AS BIGINT) AS monetary_cents
        FROM orders, mx
        GROUP BY o_custkey, max_d
    )
    SELECT c_custkey, recency_days, frequency, monetary_cents,
           CAST(NTILE(4) OVER (ORDER BY recency_days, c_custkey)
                AS BIGINT) AS r_quartile,
           CAST(NTILE(4) OVER (ORDER BY frequency DESC, c_custkey)
                AS BIGINT) AS f_quartile,
           CAST(NTILE(4) OVER (ORDER BY monetary_cents DESC, c_custkey)
                AS BIGINT) AS m_quartile
    FROM base
    """,
)
def q_customer_rfm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM customer scoring (recency / frequency / monetary + quartile
    segments) — the classic warehouse segmentation query.

    Determinism: monetary accumulates in exact integer cents; every NTILE
    ordering carries c_custkey as the tiebreak, so quartile boundaries are
    a total order in both engines. Scale shape: one groupBy on custkey
    (map-side partials); the three NTILEs run over the |customers|-row
    aggregate — at 100 TB swap the global NTILE for fixed percentile
    thresholds (approx_percentile) to avoid the single-partition window
    sort, same output contract.
    """
    from pyspark.sql import Window

    o = load_table(spark, sf_dir, "orders")
    mx = o.agg(F.max("o_orderdate").alias("max_d"))
    base = (
        o.crossJoin(F.broadcast(mx))
        .groupBy("o_custkey", "max_d")
        .agg(
            F.max("o_orderdate").alias("last_d"),
            F.count(F.lit(1)).alias("frequency"),
            F.sum(
                F.round(F.col("o_totalprice") * 100).cast("bigint")
            ).alias("monetary_cents"),
        )
        .select(
            F.col("o_custkey").alias("c_custkey"),
            F.datediff(
                F.col("max_d").cast("date"), F.col("last_d").cast("date")
            )
            .cast("bigint")
            .alias("recency_days"),
            "frequency",
            "monetary_cents",
        )
    )
    return base.select(
        "c_custkey",
        "recency_days",
        "frequency",
        "monetary_cents",
        F.ntile(4)
        .over(Window.orderBy("recency_days", "c_custkey"))
        .cast("bigint")
        .alias("r_quartile"),
        F.ntile(4)
        .over(Window.orderBy(F.desc("frequency"), F.asc("c_custkey")))
        .cast("bigint")
        .alias("f_quartile"),
        F.ntile(4)
        .over(Window.orderBy(F.desc("monetary_cents"), F.asc("c_custkey")))
        .cast("bigint")
        .alias("m_quartile"),
    )


@query(
    "q_orders_cohort_ltv",
    oracle="""
    WITH first AS (
        SELECT o_custkey,
               MIN(YEAR(o_orderdate) * 12 + MONTH(o_orderdate) - 1)
                   AS first_m
        FROM orders GROUP BY o_custkey
    ), facts AS (
        SELECT f.first_m,
               (YEAR(o.o_orderdate) * 12 + MONTH(o.o_orderdate) - 1)
                   - f.first_m AS month_offset,
               o.o_custkey,
               CAST(ROUND(o.o_totalprice * 100) AS BIGINT) AS cents
        FROM orders o JOIN first f ON o.o_custkey = f.o_custkey
    ), grid AS (
        SELECT CAST(first_m AS BIGINT) AS cohort_m,
               CAST(month_offset AS BIGINT) AS month_offset,
               COUNT(DISTINCT o_custkey) AS n_active,
               CAST(SUM(cents) AS BIGINT) AS rev_cents
        FROM facts GROUP BY 1, 2
    )
    SELECT cohort_m, month_offset, n_active,
           CAST(rev_cents AS DOUBLE) / 100.0 AS revenue,
           CAST(CAST(SUM(rev_cents) OVER (
                    PARTITION BY cohort_m ORDER BY month_offset)
                AS BIGINT) AS DOUBLE) / 100.0 AS cum_revenue
    FROM grid
    """,
)
def q_orders_cohort_ltv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort lifetime-value triangle: customers grouped by first-order
    month; per (cohort, months-since-first) the active-customer count,
    revenue, and the cohort's cumulative revenue — the money-side
    complement of q_events_retention's user-count triangle.

    Month arithmetic is pure integers (year*12 + month), no calendar
    intervals to diverge on; revenue is exact integer cents end-to-end and
    only rendered as dollars at the edge. Scale shape: the first-order
    aggregate shuffles on custkey, the fact join reuses that key, the
    triangle is |cohorts| x |offsets| cells with map-side partials, and
    the cumulative window runs over that tiny grid.
    """
    from pyspark.sql import Window

    o = load_table(spark, sf_dir, "orders")
    m = F.year("o_orderdate") * 12 + F.month("o_orderdate") - 1
    first = o.groupBy("o_custkey").agg(F.min(m).alias("first_m"))
    facts = o.join(first, "o_custkey").select(
        F.col("first_m").cast("bigint").alias("cohort_m"),
        (m - F.col("first_m")).cast("bigint").alias("month_offset"),
        "o_custkey",
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("cents"),
    )
    grid = facts.groupBy("cohort_m", "month_offset").agg(
        F.countDistinct("o_custkey").alias("n_active"),
        F.sum("cents").alias("rev_cents"),
    )
    w = (
        Window.partitionBy("cohort_m")
        .orderBy("month_offset")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return grid.select(
        "cohort_m",
        "month_offset",
        "n_active",
        (F.col("rev_cents").cast("double") / 100.0).alias("revenue"),
        (F.sum("rev_cents").over(w).cast("double") / 100.0).alias(
            "cum_revenue"
        ),
    )


@query(
    "q_agg_mode",
    oracle="""
    WITH c AS (
        SELECT l_returnflag, CAST(ROUND(l_quantity) AS BIGINT) AS qty,
               COUNT(*) AS cnt
        FROM lineitem GROUP BY 1, 2
    ), r AS (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY l_returnflag
                                     ORDER BY cnt DESC, qty ASC) AS rk
        FROM c
    )
    SELECT l_returnflag, qty AS modal_qty, cnt AS modal_count
    FROM r WHERE rk = 1
    """,
)
def q_agg_mode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact MODE per group (most frequent l_quantity per return flag) —
    the one classic aggregate the suite lacked. Neither engine's built-in
    mode() specifies tie-breaking, so both sides spell the determinism
    OUT: count per (group, value), then argmax by (count DESC, value ASC)
    — Spark as max_by over a struct key (no window), DuckDB as the
    ROW_NUMBER idiom.

    Scale shape: two chained aggregations — (group, value) partial counts
    combine map-side, then |groups| argmax rows; nothing is ever wider
    than the distinct-value count, and there is no per-group sort.
    """
    li = load_table(spark, sf_dir, "lineitem")
    c = (
        li.groupBy(
            "l_returnflag",
            F.round("l_quantity").cast("bigint").alias("qty"),
        )
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    best = c.groupBy("l_returnflag").agg(
        F.max_by(
            F.struct("qty", "cnt"),
            F.struct(F.col("cnt"), (-F.col("qty"))),
        ).alias("_m")
    )
    return best.select(
        "l_returnflag",
        F.col("_m.qty").alias("modal_qty"),
        F.col("_m.cnt").alias("modal_count"),
    )




@query(
    "q_quality_constraints",
    oracle="""
    WITH dirty AS (
        SELECT o_orderkey,
               CASE WHEN o_orderkey % 97 = 0 THEN NULL
                    ELSE o_orderstatus END AS o_orderstatus,
               CASE WHEN o_orderkey % 101 = 0 THEN -o_custkey
                    ELSE o_custkey END AS o_custkey,
               CASE WHEN o_orderkey % 103 = 0 THEN -o_totalprice
                    ELSE o_totalprice END AS o_totalprice
        FROM orders
        UNION ALL
        SELECT o_orderkey, o_orderstatus, o_custkey, o_totalprice
        FROM orders WHERE o_orderkey % 109 = 0
    )
    SELECT 'pk_unique' AS constraint_name,
           (SELECT COUNT(*) FROM (
               SELECT o_orderkey FROM dirty
               GROUP BY 1 HAVING COUNT(*) > 1)) AS n_violations
    UNION ALL
    SELECT 'status_not_null',
           (SELECT COUNT(*) FROM dirty WHERE o_orderstatus IS NULL)
    UNION ALL
    SELECT 'custkey_fk',
           (SELECT COUNT(*) FROM dirty
            WHERE o_custkey NOT IN (SELECT c_custkey FROM customer))
    UNION ALL
    SELECT 'totalprice_positive',
           (SELECT COUNT(*) FROM dirty WHERE o_totalprice <= 0)
    """,
)
def q_quality_constraints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Constraint-validation gate (the dbt-test / Deequ shape): one row
    per declared constraint with its violation count over a batch —
    primary-key uniqueness, NOT NULL, foreign-key membership, and a
    value-range rule. The clean fixture would make every count 0 (a
    vacuous check), so the batch under test is the orders table with
    DETERMINISTIC planted violations — keys %97 null their status,
    %101 negate the customer FK, %103 negate the price, %109 duplicate
    the PK row — reconstructed identically in the oracle, so each
    check's count is exact and nonzero.

    Scale shape: the dirty batch feeds four consumers, so it is
    materialized once (localCheckpoint, the scan-audit discipline);
    uniqueness is one groupBy on the key, NOT-NULL/range are scan
    aggregates, and the FK check is a BROADCAST anti-join (the customer
    key set is dimension-sized; at 100 TB a huge dimension would flip
    to a shuffled anti-join, same plan shape). Each check collapses to
    one row executor-side; the gate ships |constraints| rows, never
    violating rows — those stay queryable by re-running the predicate.
    """
    from functools import reduce

    o = load_table(spark, sf_dir, "orders")
    k = F.col("o_orderkey")
    dirty = (
        o.select(
            "o_orderkey",
            F.when(k % 97 == 0, F.lit(None))
            .otherwise(F.col("o_orderstatus"))
            .alias("o_orderstatus"),
            F.when(k % 101 == 0, -F.col("o_custkey"))
            .otherwise(F.col("o_custkey"))
            .alias("o_custkey"),
            F.when(k % 103 == 0, -F.col("o_totalprice"))
            .otherwise(F.col("o_totalprice"))
            .alias("o_totalprice"),
        )
        .unionByName(
            o.filter(k % 109 == 0).select(
                "o_orderkey", "o_orderstatus", "o_custkey", "o_totalprice"
            )
        )
        .localCheckpoint(eager=True)
    )
    cust = load_table(spark, sf_dir, "customer").select("c_custkey")
    pk = (
        dirty.groupBy("o_orderkey")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") > 1)
        .agg(
            F.lit("pk_unique").alias("constraint_name"),
            F.count(F.lit(1)).alias("n_violations"),
        )
    )
    nn = dirty.filter(F.col("o_orderstatus").isNull()).agg(
        F.lit("status_not_null").alias("constraint_name"),
        F.count(F.lit(1)).alias("n_violations"),
    )
    fk = dirty.join(
        F.broadcast(cust),
        dirty["o_custkey"] == cust["c_custkey"],
        "left_anti",
    ).agg(
        F.lit("custkey_fk").alias("constraint_name"),
        F.count(F.lit(1)).alias("n_violations"),
    )
    rng = dirty.filter(F.col("o_totalprice") <= 0).agg(
        F.lit("totalprice_positive").alias("constraint_name"),
        F.count(F.lit(1)).alias("n_violations"),
    )
    return reduce(DataFrame.unionAll, [pk, nn, fk, rng])


@query(
    "q_orders_trend",
    oracle="""
    WITH d0 AS (SELECT MIN(o_orderdate) AS d FROM orders),
    b AS (
        SELECT o_orderstatus AS status,
               CAST(DATEDIFF('day', (SELECT d FROM d0), o_orderdate)
                    AS BIGINT) AS x,
               CAST(ROUND(o_totalprice * 100) AS BIGINT) AS y
        FROM orders
    ),
    s AS (
        SELECT status, COUNT(*) AS n,
               SUM(x) AS sx, SUM(y) AS sy,
               SUM(x * y) AS sxy, SUM(x * x) AS sxx
        FROM b GROUP BY status
    )
    SELECT status, n AS n_orders,
           CAST(CAST(n AS HUGEINT) * sxy
                - CAST(sx AS HUGEINT) * sy AS DOUBLE) AS slope_num,
           CAST(CAST(n AS HUGEINT) * sxx
                - CAST(sx AS HUGEINT) * sx AS DOUBLE) AS slope_den
    FROM s
    """,
)
def q_orders_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group ordinary-least-squares trend (is revenue per order
    rising or falling over time, by order status?) with EXACT
    cross-engine math: x = integer days since the table's first order
    date, y = integer cents; the per-group sufficient statistics
    (n, Σx, Σy, Σxy, Σx²) are 64-bit-safe integer sums, and the OLS
    slope's closed form is shipped as the exact integer pair
    slope_num = n·Σxy − Σx·Σy, slope_den = n·Σx² − (Σx)² — combined in
    128-bit space (Spark DECIMAL(38,0), DuckDB HUGEINT) because n·Σxy
    overflows int64 at scale, then cast to DOUBLE (both engines round
    the same integer to the same nearest double). slope = num/den,
    left to the consumer so no float division enters the hash.

    Spark-first shape: this is regr_slope's textbook rewrite into
    algebraic aggregates — one scan, map-side partial aggregation, a
    3-row result; the global min date is a broadcast scalar joined
    into the scan stage, not a driver collect. At 100 TB the plan is
    identical: five integer sums per group riding one shuffle of
    pre-aggregated partials.
    """
    o = load_table(spark, sf_dir, "orders")
    d0 = o.agg(F.min("o_orderdate").alias("d0"))
    x = F.datediff(F.col("o_orderdate"), F.col("d0")).cast("long")
    y = F.round(F.col("o_totalprice") * 100).cast("long")
    dec = "decimal(38,0)"
    s = (
        o.crossJoin(F.broadcast(d0))
        .select(
            F.col("o_orderstatus").alias("status"),
            x.alias("x"),
            y.alias("y"),
        )
        .groupBy("status")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("x").alias("sx"),
            F.sum("y").alias("sy"),
            # per-row products fit int64 easily (x<=~2.5k days,
            # y<=~6e7 cents) but their SUM overflows int64 near SF
            # ~700 — and Spark's non-ANSI long sum WRAPS silently
            # while DuckDB widens to HUGEINT (review catch). Summing
            # into decimal(38,0) keeps both engines exact at any SF.
            F.sum(
                (F.col("x") * F.col("y")).cast("decimal(38,0)")
            ).alias("sxy"),
            F.sum(
                (F.col("x") * F.col("x")).cast("decimal(38,0)")
            ).alias("sxx"),
        )
    )
    n, sx = F.col("n").cast(dec), F.col("sx").cast(dec)
    return s.select(
        "status",
        F.col("n").alias("n_orders"),
        (n * F.col("sxy").cast(dec) - sx * F.col("sy").cast(dec))
        .cast("double")
        .alias("slope_num"),
        (n * F.col("sxx").cast(dec) - sx * sx)
        .cast("double")
        .alias("slope_den"),
    )


@query(
    "q_events_ohlc",
    oracle="""
    SELECT event_type, STRFTIME(CAST(ts AS DATE), '%Y-%m-%d') AS day,
           ARG_MIN(ROUND(value, 2),
                   printf('%020d#%012d', epoch_us(ts), event_id)) AS open,
           ROUND(MAX(value), 2) AS high,
           ROUND(MIN(value), 2) AS low,
           ARG_MAX(ROUND(value, 2),
                   printf('%020d#%012d', epoch_us(ts), event_id)) AS close,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS DOUBLE) / 100.0
               AS volume
    FROM events
    GROUP BY 1, 2
    """,
)
def q_events_ohlc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OHLC bars: per (event_type, day) open/high/low/close of ``value``
    plus count and exact volume — the candlestick / downsampling aggregate
    every metrics store (and TimescaleDB's ``ohlc``) ships.

    Open/close are argmin/argmax by time; both engines leave argmin ties
    unspecified, so the ordering key is the zero-padded (epoch_us,
    event_id) composite — a TOTAL order (event_id is unique), engine- and
    partition-stable (the q_agg_minmax_by lesson). Volume uses exact
    fixed-point accumulation (tables.exact_sum). Single-pass grouped
    aggregate: partial agg map-side, one shuffle on the group key — the
    shape that turns a 100 TB raw stream into MB-sized bars.
    """
    from ..tables import epoch_us

    ev = load_table(spark, sf_dir, "events")
    key = F.format_string(
        "%020d#%012d", epoch_us("ts"), F.col("event_id")
    )
    v2 = F.round(F.col("value"), 2)
    return ev.groupBy(
        "event_type", F.date_format("ts", "yyyy-MM-dd").alias("day")
    ).agg(
        F.min_by(v2, key).alias("open"),
        F.round(F.max("value"), 2).alias("high"),
        F.round(F.min("value"), 2).alias("low"),
        F.max_by(v2, key).alias("close"),
        F.count(F.lit(1)).alias("n_events"),
        exact_sum(F.col("value")).alias("volume"),
    )


PSI_BINS = 10
PSI_SPLIT_DAY = "2024-01-16"  # driver events span 2024-01-01..30


@query(
    "q_quality_drift",
    oracle=f"""
    WITH cents AS (
        SELECT event_type,
               CAST(ts AS DATE) < DATE '{PSI_SPLIT_DAY}' AS first_half,
               CAST(ROUND(value * 100) AS BIGINT) AS vc
        FROM events
    ), bounds AS (
        SELECT MIN(vc) AS lo, MAX(vc) AS hi FROM cents
    ), binned AS (
        SELECT c.event_type, c.first_half,
               LEAST({PSI_BINS - 1},
                     (c.vc - b.lo) * {PSI_BINS} // (b.hi - b.lo + 1))
                   AS bin
        FROM cents c CROSS JOIN bounds b
    ), spine AS (
        SELECT t.event_type, g.bin
        FROM (SELECT DISTINCT event_type FROM binned) t
        CROSS JOIN (SELECT UNNEST(GENERATE_SERIES(0, {PSI_BINS - 1}))
                    AS bin) g
    ), counts AS (
        SELECT s.event_type, s.bin,
               COUNT(*) FILTER (WHERE b.first_half) AS c1,
               COUNT(*) FILTER (WHERE NOT b.first_half) AS c2
        FROM spine s
        LEFT JOIN binned b
          ON b.event_type = s.event_type AND b.bin = s.bin
        GROUP BY 1, 2
    ), tot AS (
        SELECT event_type, SUM(c1) AS n1, SUM(c2) AS n2
        FROM counts GROUP BY 1
    ), terms AS (
        SELECT c.event_type,
               CAST(ROUND((
                   (CAST(c.c1 + 1 AS DOUBLE) / (t.n1 + {PSI_BINS})
                    - CAST(c.c2 + 1 AS DOUBLE) / (t.n2 + {PSI_BINS}))
                   * LN((CAST(c.c1 + 1 AS DOUBLE) / (t.n1 + {PSI_BINS}))
                        / (CAST(c.c2 + 1 AS DOUBLE)
                           / (t.n2 + {PSI_BINS})))
               ) * 1000000) AS BIGINT) AS term_micro
        FROM counts c JOIN tot t ON t.event_type = c.event_type
    )
    SELECT event_type,
           CAST(SUM(term_micro) AS BIGINT) AS psi_micro,
           CAST(SUM(term_micro) > 100000 AS BIGINT) AS drifted
    FROM terms
    GROUP BY event_type
    """,
)
def q_quality_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-drift monitor: Population Stability Index of each event
    type's VALUE distribution, first half of the window vs second —
    the standard production-ML drift gate (PSI > 0.1 = investigate).

    Exactness across engines: binning is pure integer math on CENTS
    (value is a 2dp double, so cents are exact; equal-width bins via
    one integer cross-multiplication — no float edge can disagree);
    Laplace(+1) smoothing keeps empty bins finite; each PSI term is
    (p-q)*ln(p/q) on IEEE doubles built from identical exact integers,
    rounded to micro-units per term and SUMMED AS BIGINT (the bigram-LM
    pattern: transcendental per-term, exact accumulation — the sum
    cannot drift with partition order). The full-bin spine (types x
    bins) makes one-sided-empty bins contribute, not vanish.

    Scale shape: one scan collapses to |types| x 2 x bins counts
    (map-side combine); everything after is KB-sized. The split
    predicate and bin edges push into the scan stage.
    """
    ev = load_table(spark, sf_dir, "events")
    cents = ev.select(
        "event_type",
        (F.to_date("ts") < F.lit(PSI_SPLIT_DAY).cast("date")).alias(
            "first_half"
        ),
        F.round(F.col("value") * 100).cast("bigint").alias("vc"),
    )
    bounds = cents.agg(
        F.min("vc").alias("lo"), F.max("vc").alias("hi")
    )
    # `div`, not `/`: Spark's `/` on longs is DOUBLE division, whose
    # rounding could in principle disagree with DuckDB's integer `//`
    # at a bin edge — integer division on both sides can't.
    binned = cents.crossJoin(F.broadcast(bounds)).select(
        "event_type",
        "first_half",
        F.least(
            F.lit(PSI_BINS - 1).cast("bigint"),
            F.expr(f"((vc - lo) * {PSI_BINS}) div (hi - lo + 1)"),
        ).cast("bigint").alias("bin"),
    )
    # distinct types come from cents, BEFORE the bounds crossJoin — the
    # spine branch must not drag a second full-table MIN/MAX subtree
    # along (review catch)
    spine = (
        cents.select("event_type")
        .distinct()
        .crossJoin(
            F.broadcast(
                spark.range(PSI_BINS).select(F.col("id").alias("bin"))
            )
        )
    )
    counts = (
        spine.join(binned, ["event_type", "bin"], "left")
        .groupBy("event_type", "bin")
        .agg(
            F.count(F.when(F.col("first_half") == True, 1)).alias("c1"),  # noqa: E712
            F.count(F.when(F.col("first_half") == False, 1)).alias("c2"),  # noqa: E712
        )
    )
    tot = counts.groupBy("event_type").agg(
        F.sum("c1").alias("n1"), F.sum("c2").alias("n2")
    )
    j = counts.join(F.broadcast(tot), "event_type")
    p = (F.col("c1") + 1).cast("double") / (F.col("n1") + PSI_BINS)
    q = (F.col("c2") + 1).cast("double") / (F.col("n2") + PSI_BINS)
    term = F.round(((p - q) * F.log(p / q)) * 1000000).cast("bigint")
    return (
        j.select("event_type", term.alias("term_micro"))
        .groupBy("event_type")
        .agg(F.sum("term_micro").cast("bigint").alias("psi_micro"))
        .select(
            "event_type",
            "psi_micro",
            (F.col("psi_micro") > 100000).cast("bigint").alias("drifted"),
        )
    )


@query(
    "q_orders_gini",
    oracle="""
    WITH ranked AS (
        SELECT o_orderpriority,
               CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents,
               ROW_NUMBER() OVER (
                   PARTITION BY o_orderpriority
                   ORDER BY ROUND(o_totalprice * 100), o_orderkey
               ) AS i
        FROM orders
    ), agg AS (
        SELECT o_orderpriority,
               COUNT(*) AS n,
               SUM(CAST(cents AS HUGEINT)) AS s,
               SUM(CAST(i AS HUGEINT) * cents) AS six
        FROM ranked GROUP BY 1
    )
    SELECT o_orderpriority,
           CAST(n AS BIGINT) AS n_orders,
           CAST(s AS BIGINT) AS cents,
           ROUND(CAST(2 * six - (n + 1) * s AS DOUBLE)
                 / CAST(n * s AS DOUBLE), 6) AS gini
    FROM agg
    """,
)
def q_orders_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini concentration index of order value per priority class — the
    inequality / revenue-concentration metric (0 = perfectly even,
    -> 1 = one order carries everything), computed by the rank formula
    G = (2 * sum(i * x_i) - (n + 1) * S) / (n * S) over the
    (cents, orderkey)-sorted series.

    Exactness: values are exact CENTS, the rank is a ROW_NUMBER over a
    TOTAL order (the unique orderkey breaks value ties identically in
    both engines — with ties the rank formula is order-sensitive, so
    the total order is semantics, not hygiene), and both accumulators
    are wide integers (Spark DECIMAL(38,0), DuckDB HUGEINT — sum(i*x)
    passes 2^63 at warehouse scale; the autocorr lesson). The reported
    ratio is one correctly-rounded double division of exact integers.

    Scale shape: one window over the group key (single shuffle + sort),
    then a partial-aggregated groupBy on the SAME key — Catalyst reuses
    the window's partitioning, no second exchange.
    """
    o = load_table(spark, sf_dir, "orders")
    cents = F.round(F.col("o_totalprice") * 100).cast("bigint")
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.round(F.col("o_totalprice") * 100), F.col("o_orderkey")
    )
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    ranked = o.select(
        "o_orderpriority",
        cents.alias("cents"),
        F.row_number().over(w).cast("bigint").alias("i"),
    )
    agg = ranked.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(dec(F.col("cents"))).alias("s"),
        F.sum(dec(F.col("i")) * dec(F.col("cents"))).alias("six"),
    )
    num = (
        F.lit(2).cast("decimal(38,0)") * F.col("six")
        - (F.col("n") + 1).cast("decimal(38,0)") * F.col("s")
    )
    den = F.col("n").cast("decimal(38,0)") * F.col("s")
    return agg.select(
        "o_orderpriority",
        F.col("n").cast("bigint").alias("n_orders"),
        F.col("s").cast("bigint").alias("cents"),
        F.round(
            num.cast("double") / den.cast("double"), 6
        ).alias("gini"),
    )


HLL_ERROR_BOUND_PCT = 15  # 3x the configured rsd=5%: measured relative
# error 0.0 / 0.67 / 6.67 % at sf0.001/0.01/0.1 — the standard
# HyperLogLog 3-sigma envelope, never tight against the measurement
PCTL_RANK_EPS = 0.01  # approx_percentile accuracy=100 -> 1% rank error
PCTL_CHECK_EPS = 0.02  # acceptance interval: 2x the contract (review
# catch: checking against the exact 49th/51st INTERPOLATED percentiles
# is strictly tighter than the rank-error guarantee at the boundary —
# a contract-compliant sketch could fail; the 2x interval provably
# contains every rank within eps of the median)


@query(
    "q_sketch_error_bounds",
    oracle=f"""
    SELECT CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_users,
           CAST({HLL_ERROR_BOUND_PCT} AS BIGINT) AS hll_bound_pct,
           CAST(1 AS BIGINT) AS hll_within_bound,
           CAST(1 AS BIGINT) AS pctl_within_rank_eps
    FROM events
    """,
)
def q_sketch_error_bounds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MEASURED sketch accuracy (the recall-floor pattern applied to
    the two approximate aggregates): the HyperLogLog distinct count
    (rsd=5%) must land within {HLL_ERROR_BOUND_PCT}% of the exact
    count, and approx_percentile's median (accuracy=100, i.e. <=1%
    rank error by the Greenwald-Khanna contract) must land between
    the EXACT 47th and 53rd percentiles (2x the contract interval, so
    a boundary-compliant sketch can never fail the check) — the
    sketch guarantee checked as data, not assumed. Converts 'the sketches ran'
    (q_agg_approx_distinct / q_agg_percentile_approx stay rows-only
    for their full outputs, which are engine-specific at the
    boundary) into oracled claims about their ERROR. ``exact_users``
    rides in the hash so both engines count the ground truth
    independently — a fixture drift and a broken sketch both
    mismatch.

    Scale shape: this is the production acceptance test for replacing
    an exact distinct/percentile (full shuffle of the key space) with
    a constant-state sketch at 100 TB — run on a sample, check the
    bound holds, then deploy the sketch; both sketch buffers are
    map-side combinable, one scan, no shuffle."""
    ev = load_table(spark, sf_dir, "events")
    r = ev.agg(
        F.approx_count_distinct("user_id", 0.05).alias("hll"),
        F.countDistinct("user_id").alias("exact"),
        F.expr("approx_percentile(value, 0.5, 100)").alias("p50a"),
        F.expr(f"percentile(value, {0.5 - PCTL_CHECK_EPS - PCTL_RANK_EPS})").alias("lo"),
        F.expr(f"percentile(value, {0.5 + PCTL_CHECK_EPS + PCTL_RANK_EPS})").alias("hi"),
    ).collect()[0]
    hll_ok = int(
        100 * abs(r.hll - r.exact) <= HLL_ERROR_BOUND_PCT * r.exact
    )
    pctl_ok = int(r.lo <= r.p50a <= r.hi)
    return tiny_df(spark, 
        [(r.exact, HLL_ERROR_BOUND_PCT, hll_ok, pctl_ok)],
        "exact_users bigint, hll_bound_pct bigint, "
        "hll_within_bound bigint, pctl_within_rank_eps bigint",
    )
