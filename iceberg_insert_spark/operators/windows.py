"""Window-function operators (SURVEY.md §2.4).

Every window spec carries a total ordering (unique tie-break key) so results
are deterministic across engines; ROW/RANGE frames are expressed over integer
keys where the oracle's frame semantics must match exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import query
from ..tables import load_table


@query(
    "q_win_rank",
    oracle="""
    SELECT c_custkey, c_mktsegment, c_acctbal,
           RANK()       OVER w AS rnk,
           DENSE_RANK() OVER w AS drnk,
           ROW_NUMBER() OVER w AS rn
    FROM customer
    WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey)
    """,
)
def q_win_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rank / dense_rank / row_number per market segment."""
    c = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.desc("c_acctbal"), F.asc("c_custkey")
    )
    return c.select(
        "c_custkey",
        "c_mktsegment",
        "c_acctbal",
        F.rank().over(w).cast("bigint").alias("rnk"),
        F.dense_rank().over(w).cast("bigint").alias("drnk"),
        F.row_number().over(w).cast("bigint").alias("rn"),
    )


@query(
    "q_win_running",
    oracle="""
    SELECT o_orderkey, o_custkey,
           ROUND(SUM(o_totalprice) OVER (
               PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_total,
           COUNT(*) OVER (
               PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS running_n
    FROM orders
    """,
)
def q_win_running(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running sum/count per customer over order time."""
    o = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.asc("o_orderdate"), F.asc("o_orderkey"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return o.select(
        "o_orderkey",
        "o_custkey",
        F.round(F.sum("o_totalprice").over(w), 2).alias("running_total"),
        F.count(F.lit(1)).over(w).alias("running_n"),
    )


@query(
    "q_win_lead_lag",
    oracle="""
    SELECT event_id, user_id, value,
           LAG(value)  OVER w AS prev_value,
           LEAD(value) OVER w AS next_value,
           LAG(event_type, 1, 'none') OVER w AS prev_type
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
)
def q_win_lead_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag/lead of event values per user over time (edge rows -> NULL/default)."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.asc("ts"), F.asc("event_id"))
    return ev.select(
        "event_id",
        "user_id",
        "value",
        F.lag("value").over(w).alias("prev_value"),
        F.lead("value").over(w).alias("next_value"),
        F.lag("event_type", 1, "none").over(w).alias("prev_type"),
    )


@query(
    "q_win_range_frame",
    oracle="""
    SELECT o_orderkey, o_custkey, day_num,
           ROUND(AVG(o_totalprice) OVER (
               PARTITION BY o_custkey ORDER BY day_num
               RANGE BETWEEN 30 PRECEDING AND CURRENT ROW), 4) AS moving_avg
    FROM (SELECT *, DATEDIFF('day', TIMESTAMP '1995-01-01 00:00:00', o_orderdate) AS day_num
          FROM orders)
    """,
)
def q_win_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """30-day moving average via a RANGE frame over an integer day number.

    RANGE frames include all peers of the boundary values, so the result is
    deterministic even when a customer has several orders on one day.
    """
    o = load_table(spark, sf_dir, "orders").withColumn(
        "day_num",
        F.datediff(
            F.col("o_orderdate"), F.lit("1995-01-01 00:00:00").cast("timestamp_ntz")
        ),
    )
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.asc("day_num"))
        .rangeBetween(-30, Window.currentRow)
    )
    return o.select(
        "o_orderkey",
        "o_custkey",
        F.col("day_num").cast("bigint").alias("day_num"),
        F.round(F.avg("o_totalprice").over(w), 4).alias("moving_avg"),
    )


@query(
    "q_topk_per_group",
    oracle="""
    SELECT c_custkey, o_orderkey, o_totalprice, rn
    FROM (SELECT o_custkey AS c_custkey, o_orderkey, o_totalprice,
                 ROW_NUMBER() OVER (PARTITION BY o_custkey
                                    ORDER BY o_totalprice DESC, o_orderkey) AS rn
          FROM orders)
    WHERE rn <= 3
    """,
)
def q_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders per customer: row_number + filter (the scalable top-k —
    no global sort, one shuffle on the group key)."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return (
        o.select(
            F.col("o_custkey").alias("c_custkey"),
            "o_orderkey",
            "o_totalprice",
            F.row_number().over(w).cast("bigint").alias("rn"),
        )
        .filter(F.col("rn") <= 3)
    )


@query(
    "q_win_distribution",
    oracle="""
    SELECT c_custkey,
           c_mktsegment,
           CAST(NTILE(4) OVER w AS BIGINT) AS quartile,
           ROUND(PERCENT_RANK() OVER w, 6) AS pct_rank,
           ROUND(CUME_DIST() OVER w, 6) AS cume,
           FIRST_VALUE(c_custkey) OVER w AS poorest_key,
           LAST_VALUE(c_custkey) OVER
               (PARTITION BY c_mktsegment
                ORDER BY c_acctbal ASC, c_custkey ASC
                ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
               AS richest_key
    FROM customer
    WINDOW w AS (PARTITION BY c_mktsegment
                 ORDER BY c_acctbal ASC, c_custkey ASC)
    """,
)
def q_win_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution window functions: ntile / percent_rank / cume_dist /
    first_value / last_value. The tie-break key (c_custkey) makes every rank
    total, so peer-dependent cume_dist is engine-stable; last_value needs the
    explicit unbounded-following frame (default frame stops at current row)."""
    c = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.asc("c_acctbal"), F.asc("c_custkey")
    )
    wfull = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return c.select(
        "c_custkey",
        "c_mktsegment",
        F.ntile(4).over(w).cast("bigint").alias("quartile"),
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cume"),
        F.first("c_custkey").over(w).alias("poorest_key"),
        F.last("c_custkey").over(wfull).alias("richest_key"),
    )


SCD2_CURRENT_SENTINEL_US = 253_402_300_800_000_000  # 9999-12-31T00:00:00Z

_SCD2_REBUILD_SQL = f"""
    SELECT user_id, event_id,
           value AS state_value,
           epoch_us(CAST(ts AS TIMESTAMP)) AS valid_from_us,
           COALESCE(LEAD(epoch_us(CAST(ts AS TIMESTAMP)))
                        OVER (PARTITION BY user_id ORDER BY ts, event_id),
                    {SCD2_CURRENT_SENTINEL_US}) AS valid_to_us,
           CAST(LEAD(event_id)
                    OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                AS BIGINT) AS is_current
    FROM events
    WHERE event_type = 'purchase'
    """


def _scd2_build(changes: DataFrame) -> DataFrame:
    """Change stream -> SCD2 validity intervals (one window pass per key)."""
    from ..tables import epoch_us

    w = Window.partitionBy("user_id").orderBy(F.asc("ts"), F.asc("event_id"))
    ts_us = epoch_us("ts")
    return changes.select(
        "user_id",
        "event_id",
        F.col("value").alias("state_value"),
        ts_us.alias("valid_from_us"),
        F.coalesce(
            F.lead(ts_us).over(w), F.lit(SCD2_CURRENT_SENTINEL_US)
        ).alias("valid_to_us"),
        F.lead("event_id").over(w).isNull().cast("bigint").alias("is_current"),
    )


@query("q_scd2_intervals", oracle=_SCD2_REBUILD_SQL)
def q_scd2_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD Type-2 dimension build: turn a change stream (purchases as state
    changes per user) into validity intervals [valid_from, valid_to) with an
    is_current flag — the standard warehouse pattern for as-of dimension
    lookups (pairs with q_join_asof on the query side).

    One window pass partitioned by the business key: lead(ts) closes each
    interval, the open interval gets a far-future sentinel (9999-12-31) so
    BETWEEN predicates need no NULL branch. At 100 TB this is one shuffle on
    the business key; incremental maintenance merges only keys present in
    the new batch."""
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type") == "purchase"
    )
    return _scd2_build(ev)


SCD2_CUTOFF = "2024-01-20 00:00:00"


@query("q_scd2_incremental", oracle=_SCD2_REBUILD_SQL)
def q_scd2_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental SCD2 maintenance — merge a new change batch into an
    existing dimension WITHOUT rebuilding history, oracled against the full
    rebuild (same SQL as q_scd2_intervals): the incremental path must be
    indistinguishable from recomputing everything.

    The dimension is built from changes before SCD2_CUTOFF; the batch is
    everything after. Merge touches ONLY keys present in the batch:
      * untouched users' rows pass through (anti-join on the batch's tiny
        distinct-key set);
      * touched users' CLOSED rows pass through unchanged (history is
        immutable);
      * each touched user's OPEN row closes at that user's first batch
        change (broadcast of a per-key min — batch-sized, not dim-sized);
      * the batch itself chains through the same one-window build.
    At 100 TB the cost is O(batch + touched keys), never O(dimension):
    history is neither read nor rewritten beyond the open rows, which is
    exactly Iceberg MERGE's matched-row surface."""
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type") == "purchase"
    )
    return scd2_merge(ev, SCD2_CUTOFF)


def scd2_merge(changes: DataFrame, cutoff_ts: str) -> DataFrame:
    """Merge the post-cutoff slice of a change stream into the SCD2
    dimension built from the pre-cutoff slice; see q_scd2_incremental for
    the merge surface. Equality with the full rebuild for ANY cutoff is
    pinned by tests/test_properties.py::test_scd2_incremental_any_cutoff."""
    from ..tables import epoch_us

    cutoff = F.lit(cutoff_ts).cast("timestamp_ntz")
    dim = _scd2_build(changes.filter(F.col("ts") < cutoff))
    batch = changes.filter(F.col("ts") >= cutoff)

    touched = batch.select("user_id").distinct()
    untouched = dim.join(F.broadcast(touched), "user_id", "left_anti")
    t_dim = dim.join(F.broadcast(touched), "user_id")
    hist = t_dim.filter(F.col("is_current") == 0)
    first_batch = batch.groupBy("user_id").agg(
        F.min(epoch_us("ts")).alias("_first_us")
    )
    closed_open = (
        t_dim.filter(F.col("is_current") == 1)
        .join(F.broadcast(first_batch), "user_id")
        .select(
            "user_id",
            "event_id",
            "state_value",
            "valid_from_us",
            F.col("_first_us").alias("valid_to_us"),
            F.lit(0).cast("bigint").alias("is_current"),
        )
    )
    new_rows = _scd2_build(batch)
    cols = [
        "user_id",
        "event_id",
        "state_value",
        "valid_from_us",
        "valid_to_us",
        "is_current",
    ]
    return (
        untouched.select(cols)
        .unionByName(hist.select(cols))
        .unionByName(closed_open.select(cols))
        .unionByName(new_rows.select(cols))
    )


@query(
    "q_scd2_asof_enrich",
    oracle=f"""
    WITH dim AS ({_SCD2_REBUILD_SQL}),
    fact AS (
        SELECT event_id, user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us
        FROM events WHERE event_type = 'click'
    )
    SELECT f.event_id, f.user_id, f.ts_us,
           d.state_value, d.event_id AS state_event_id
    FROM fact f LEFT JOIN dim d
      ON d.user_id = f.user_id
     AND f.ts_us >= d.valid_from_us AND f.ts_us < d.valid_to_us
    """,
)
def q_scd2_asof_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dimension-enriched fact query: every click event picks up the user's
    purchase state AS OF the click time from the SCD2 validity intervals —
    the standard warehouse composition of q_scd2_intervals (dimension side)
    and q_join_asof (lookup side), proving the two operators compose.

    The interval lookup is spelled as an equi-join on the business key with
    the [valid_from, valid_to) containment as a residual predicate: Catalyst
    plans the user_id equality as an ordinary shuffled join (NO nested-loop
    range join), and because SCD2 intervals are disjoint per key, at most
    one dimension row survives the residual — row counts are fact-stable.
    Clicks before a user's first purchase keep NULL state via the left join.
    At 100 TB: one shuffle of each side on user_id; the far-future sentinel
    on open intervals means no NULL branch in the predicate."""
    from ..tables import epoch_us

    ev = load_table(spark, sf_dir, "events")
    dim = _scd2_build(ev.filter(F.col("event_type") == "purchase"))
    fact = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", epoch_us("ts").alias("ts_us")
    )
    d = dim.alias("d")
    f_ = fact.alias("f")
    return f_.join(
        d,
        (F.col("d.user_id") == F.col("f.user_id"))
        & (F.col("f.ts_us") >= F.col("d.valid_from_us"))
        & (F.col("f.ts_us") < F.col("d.valid_to_us")),
        "left",
    ).select(
        "f.event_id",
        "f.user_id",
        "f.ts_us",
        "d.state_value",
        F.col("d.event_id").alias("state_event_id"),
    )


@query(
    "q_events_gapfill",
    oracle="""
    WITH daily AS (
        SELECT user_id, CAST(ts AS DATE) AS d,
               CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT)
                   AS cents
        FROM events WHERE event_type = 'purchase'
        GROUP BY 1, 2
    ), span AS (
        SELECT user_id, MIN(d) AS lo, MAX(d) AS hi FROM daily GROUP BY 1
    ), grid AS (
        SELECT user_id,
               CAST(UNNEST(GENERATE_SERIES(lo, hi, INTERVAL 1 DAY)) AS DATE)
                   AS d
        FROM span
    ), joined AS (
        SELECT g.user_id, g.d, daily.cents
        FROM grid g LEFT JOIN daily
          ON daily.user_id = g.user_id AND daily.d = g.d
    )
    SELECT user_id, STRFTIME(d, '%Y-%m-%d') AS day,
           CAST(LAST_VALUE(cents IGNORE NULLS) OVER (
                    PARTITION BY user_id ORDER BY d
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS BIGINT) AS filled_cents,
           CAST(cents IS NULL AS BIGINT) AS is_gap
    FROM joined
    """,
)
def q_events_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series resample + forward fill: each user's daily purchase
    total, densified to EVERY day in the user's activity span with gaps
    carrying the last observed value — the gap-filling primitive
    (TimescaleDB ``locf`` / pandas ``resample().ffill()``) that Spark has
    no native operator for.

    Rewrite: per-user day grid via ``sequence(lo, hi)`` explode (bounded
    by span length, no shuffle beyond the daily aggregate's), left join
    the observed days on the already-co-partitioned (user, day) key, then
    one ``last(ignorenulls)`` running window per user. The first grid day
    is observed by construction, so the fill is total. Values are exact
    integer cents; the window is partitioned by user — no skew beyond a
    user's span length, no global sort.
    """
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type") == "purchase"
    )
    daily = (
        ev.select(
            "user_id",
            F.col("ts").cast("date").alias("d"),
            F.round(F.col("value") * 100).cast("bigint").alias("cents"),
        )
        .groupBy("user_id", "d")
        .agg(F.sum("cents").alias("cents"))
    )
    span = daily.groupBy("user_id").agg(
        F.min("d").alias("lo"), F.max("d").alias("hi")
    )
    grid = span.select(
        "user_id",
        F.explode(F.expr("sequence(lo, hi, interval 1 day)")).alias("d"),
    )
    joined = grid.join(daily, ["user_id", "d"], "left")
    w = (
        Window.partitionBy("user_id")
        .orderBy("d")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return joined.select(
        "user_id",
        F.date_format("d", "yyyy-MM-dd").alias("day"),
        F.last("cents", ignorenulls=True).over(w).alias("filled_cents"),
        F.col("cents").isNull().cast("bigint").alias("is_gap"),
    )


@query(
    "q_orders_backlog",
    oracle="""
    WITH placed AS (
        SELECT DATE_TRUNC('month', o_orderdate) AS m, COUNT(*) AS n
        FROM orders GROUP BY 1
    ), fulfilled AS (
        SELECT DATE_TRUNC('month', mx) AS m, COUNT(*) AS n
        FROM (SELECT o_orderkey, MAX(l_shipdate) AS mx
              FROM orders JOIN lineitem ON l_orderkey = o_orderkey
              GROUP BY o_orderkey)
        GROUP BY 1
    ), months AS (
        SELECT m FROM placed UNION SELECT m FROM fulfilled
    )
    SELECT STRFTIME(months.m, '%Y-%m') AS month,
           CAST(COALESCE(p.n, 0) AS BIGINT) AS n_placed,
           CAST(COALESCE(f.n, 0) AS BIGINT) AS n_fulfilled,
           CAST(SUM(COALESCE(p.n, 0) - COALESCE(f.n, 0)) OVER (
                    ORDER BY months.m
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS BIGINT) AS open_backlog
    FROM months
    LEFT JOIN placed p ON p.m = months.m
    LEFT JOIN fulfilled f ON f.m = months.m
    """,
)
def q_orders_backlog(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Open-order backlog over time: per month, orders placed, orders
    fully fulfilled (every lineitem shipped), and the running count of
    still-open orders — the interval-stabbing query ("how many intervals
    cover time t") rewritten as +1/-1 event prefix sums, the shape that
    replaces an O(orders x timepoints) range join.

    Scale shape: fulfillment time is one orderkey-keyed max over the
    fact join (map-side partials; the join is the unavoidable fact-fact
    shuffle); both event streams then collapse to a |months|-row frame
    where the full-outer month alignment and the cumulative window are
    O(months) — the global window never sees the corpus, so no offset
    machinery is needed. Counts are exact longs throughout.
    """
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_shipdate"
    )
    placed = o.groupBy(
        F.date_trunc("month", "o_orderdate").alias("m")
    ).agg(F.count(F.lit(1)).alias("n_placed"))
    fulfilled = (
        o.join(li, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy("o_orderkey")
        .agg(F.max("l_shipdate").alias("mx"))
        .groupBy(F.date_trunc("month", "mx").alias("m"))
        .agg(F.count(F.lit(1)).alias("n_fulfilled"))
    )
    months = placed.join(fulfilled, "m", "full_outer").select(
        "m",
        F.coalesce("n_placed", F.lit(0)).alias("n_placed"),
        F.coalesce("n_fulfilled", F.lit(0)).alias("n_fulfilled"),
    )
    w = Window.orderBy("m").rowsBetween(Window.unboundedPreceding, 0)
    return months.select(
        F.date_format("m", "yyyy-MM").alias("month"),
        "n_placed",
        "n_fulfilled",
        F.sum(F.col("n_placed") - F.col("n_fulfilled")).over(w).alias(
            "open_backlog"
        ),
    )


@query(
    "q_events_transitions",
    oracle="""
    WITH seq AS (
        SELECT user_id, event_type,
               LEAD(event_type) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id) AS next_type
        FROM events
    ), pairs AS (
        SELECT event_type AS src, next_type AS dst
        FROM seq WHERE next_type IS NOT NULL
    ), n AS (SELECT src, COUNT(*) AS n_src FROM pairs GROUP BY src)
    SELECT src, dst, COUNT(*) AS n_trans,
           CAST(COUNT(*) * 1000000 // n_src AS BIGINT) AS prob_ppm
    FROM pairs JOIN n USING (src)
    GROUP BY src, dst, n_src
    """,
)
def q_events_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over per-user event sequences:
    for each (src, dst) event-type pair, how often dst directly follows
    src, and the row-normalized transition probability in ppm — the
    behavioral-sequence analytics primitive (next-action prediction,
    anomaly flows, UX-path audits).

    Scale shape: ONE pass over the events table — a per-user lead window
    builds the adjacency (the sort is per-user, no global order), then a
    |types|^2-group aggregate with map-side partials; the row-normalizer
    is a second window over THAT |types|^2-row aggregate (partitioned by
    src), so the event scan is never repeated — a join against a marginal
    derived from the same counts would plan the whole scan+window subtree
    twice. Determinism: (ts, event_id) is a total order (the repo-wide
    duplicate-timestamp convention), and probabilities are integral ppm
    on positive counts.
    """
    ev = load_table(spark, sf_dir, "events")
    wseq = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = (
        ev.select(
            F.col("event_type").alias("src"),
            F.lead("event_type").over(wseq).alias("dst"),
        )
        .filter(F.col("dst").isNotNull())
    )
    counts = pairs.groupBy("src", "dst").agg(
        F.count(F.lit(1)).alias("n_trans")
    )
    return counts.select(
        "src",
        "dst",
        "n_trans",
        F.expr(
            "n_trans * 1000000 div SUM(n_trans)"
            " OVER (PARTITION BY src)"
        ).alias("prob_ppm"),
    )


@query(
    "q_events_gapfill_interp",
    oracle="""
    WITH daily AS (
        SELECT user_id, CAST(ts AS DATE) AS d,
               CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT)
                   AS cents
        FROM events WHERE event_type = 'purchase'
        GROUP BY 1, 2
    ), span AS (
        SELECT user_id, MIN(d) AS lo, MAX(d) AS hi FROM daily GROUP BY 1
    ), grid AS (
        SELECT user_id,
               CAST(UNNEST(GENERATE_SERIES(lo, hi, INTERVAL 1 DAY)) AS DATE)
                   AS d
        FROM span
    ), joined AS (
        SELECT g.user_id, g.d, daily.cents
        FROM grid g LEFT JOIN daily
          ON daily.user_id = g.user_id AND daily.d = g.d
    ), bounded AS (
        SELECT user_id, d, cents,
               LAST_VALUE(cents IGNORE NULLS) OVER (
                   PARTITION BY user_id ORDER BY d
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS prev_c,
               LAST_VALUE(CASE WHEN cents IS NOT NULL THEN d END
                          IGNORE NULLS) OVER (
                   PARTITION BY user_id ORDER BY d
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS prev_d,
               FIRST_VALUE(cents IGNORE NULLS) OVER (
                   PARTITION BY user_id ORDER BY d
                   ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
                   AS next_c,
               FIRST_VALUE(CASE WHEN cents IS NOT NULL THEN d END
                           IGNORE NULLS) OVER (
                   PARTITION BY user_id ORDER BY d
                   ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
                   AS next_d
        FROM joined
    )
    SELECT user_id, STRFTIME(d, '%Y-%m-%d') AS day,
           CAST(CASE WHEN cents IS NOT NULL THEN cents * 1000
                ELSE (prev_c * DATE_DIFF('day', d, next_d)
                      + next_c * DATE_DIFF('day', prev_d, d)) * 1000
                     // DATE_DIFF('day', prev_d, next_d)
                END AS BIGINT) AS interp_milli,
           CAST(cents IS NULL AS BIGINT) AS is_gap
    FROM bounded
    """,
)
def q_events_gapfill_interp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear-interpolation gap fill — the ``interpolate()`` twin of
    q_events_gapfill's locf: a gap day between two observations gets the
    straight-line value between them, weighted by its position in the gap.

    Same densify machinery (per-user day grid + left join); the fill adds
    two more running windows (previous/next observed value AND day) over
    the identical partition ordering — Spark computes all four in the one
    per-user sort. The first and last grid days are observed by
    construction, so both bounds always exist.

    Determinism: interpolation in exact integer milli-cents via
    prev*(span-offset) + next*offset — a sum of two NON-NEGATIVE products
    — then one integral division by the positive span, so Spark's
    truncating `div` and DuckDB's flooring `//` agree (they diverge on
    negative operands, which this spelling makes unreachable for a
    non-negative series — purchase amounts here; a signed series would
    need an offset shift first); no float ever enters the fill.
    """
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type") == "purchase"
    )
    daily = (
        ev.select(
            "user_id",
            F.col("ts").cast("date").alias("d"),
            F.round(F.col("value") * 100).cast("bigint").alias("cents"),
        )
        .groupBy("user_id", "d")
        .agg(F.sum("cents").alias("cents"))
    )
    span = daily.groupBy("user_id").agg(
        F.min("d").alias("lo"), F.max("d").alias("hi")
    )
    grid = span.select(
        "user_id",
        F.explode(F.expr("sequence(lo, hi, interval 1 day)")).alias("d"),
    )
    joined = grid.join(daily, ["user_id", "d"], "left")
    wb = (
        Window.partitionBy("user_id")
        .orderBy("d")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wf = (
        Window.partitionBy("user_id")
        .orderBy("d")
        .rowsBetween(0, Window.unboundedFollowing)
    )
    obs_d = F.when(F.col("cents").isNotNull(), F.col("d"))
    bounded = joined.select(
        "user_id",
        "d",
        "cents",
        F.last("cents", ignorenulls=True).over(wb).alias("prev_c"),
        F.last(obs_d, ignorenulls=True).over(wb).alias("prev_d"),
        F.first("cents", ignorenulls=True).over(wf).alias("next_c"),
        F.first(obs_d, ignorenulls=True).over(wf).alias("next_d"),
    )
    interp = F.when(
        F.col("cents").isNotNull(), F.col("cents") * 1000
    ).otherwise(
        F.expr(
            "(prev_c * datediff(next_d, d) + next_c * datediff(d, prev_d))"
            " * 1000 div datediff(next_d, prev_d)"
        )
    )
    return bounded.select(
        "user_id",
        F.date_format("d", "yyyy-MM-dd").alias("day"),
        interp.cast("bigint").alias("interp_milli"),
        F.col("cents").isNull().cast("bigint").alias("is_gap"),
    )


@query(
    "q_ts_ewma",
    oracle="""
    WITH daily AS (
        SELECT event_type, CAST(ts AS DATE) AS d, COUNT(*) AS cnt
        FROM events
        GROUP BY 1, 2
    )
    SELECT a.event_type,
           STRFTIME(a.d, '%Y-%m-%d') AS day,
           a.cnt AS cnt,
           SUM(b.cnt * POWER(0.5, DATE_DIFF('day', b.d, a.d))) AS ewma,
           COUNT(*) AS n_terms
    FROM daily a
    JOIN daily b
      ON b.event_type = a.event_type
     AND DATE_DIFF('day', b.d, a.d) BETWEEN 0 AND 29
    GROUP BY 1, 2, 3
    """,
)
def q_ts_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially-weighted moving average over each event type's
    DAILY count series, alpha = 1/2, trailing 30 CALENDAR days —
    absent days contribute no term but still decay the weights
    (calendar-distance decay, the honest semantics across gaps). The
    match is EXACT, not rounded: every term is cnt * 2^-k with k <= 29,
    a dyadic rational whose running sums stay below 2^53 in units of
    2^-29, so IEEE addition is exact in ANY order and Spark and DuckDB
    produce bit-identical doubles — the same fixed-point discipline as
    the rest of the suite, applied to floating point.

    Rewrite: Spark has no weighted window frame, so the EWMA is a bounded
    RANGE SELF-JOIN over the daily AGGREGATE (types x days rows — KBs
    at any corpus size, never the raw events): anchor day joins its
    trailing 29 days per type, weight = pow(0.5, datediff), one
    group-by back to the anchor. Scale shape: the raw-events scan
    aggregates down FIRST (partial map-side combine), the self-join
    fans out <= 30x on the tiny aggregate, and everything after the
    daily rollup fits in one executor regardless of input size.
    """
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.col("ts").cast("date").alias("d")
    ).agg(F.count(F.lit(1)).alias("cnt"))
    a = daily.alias("a")
    b = daily.alias("b")
    dd = F.datediff(F.col("a.d"), F.col("b.d"))
    return (
        a.join(
            b,
            (F.col("b.event_type") == F.col("a.event_type"))
            & (dd >= 0)
            & (dd <= 29),
        )
        .groupBy(
            F.col("a.event_type").alias("event_type"),
            F.date_format("a.d", "yyyy-MM-dd").alias("day"),
            F.col("a.cnt").alias("cnt"),
        )
        .agg(
            F.sum(
                F.col("b.cnt") * F.pow(F.lit(0.5), dd.cast("double"))
            ).alias("ewma"),
            F.count(F.lit(1)).alias("n_terms"),
        )
    )



def _daily_gapfilled(ev: DataFrame):
    """Shared first tier of the exact time-series operators (ACF /
    CUSUM / seasonality): collapse the raw event scan to gap-filled
    (event_type, d, x) daily counts over the GLOBAL calendar — zero
    days are real observations for all three. Returns (filled, bounds);
    one definition so a spine fix can never land in only one query."""
    daily = ev.groupBy(
        "event_type", F.to_date("ts").alias("d")
    ).agg(F.count(F.lit(1)).alias("x"))
    bounds = ev.agg(
        F.min(F.to_date("ts")).alias("lo"),
        F.max(F.to_date("ts")).alias("hi"),
    )
    spine = (
        daily.select("event_type")
        .distinct()
        .crossJoin(F.broadcast(bounds))
        .select("event_type", F.explode(F.sequence("lo", "hi")).alias("d"))
    )
    filled = spine.join(daily, ["event_type", "d"], "left").select(
        "event_type", "d", F.coalesce("x", F.lit(0)).alias("x")
    )
    return filled, bounds


@query(
    "q_ts_autocorr",
    oracle="""
    WITH bounds AS (
        SELECT MIN(CAST(ts AS DATE)) AS lo, MAX(CAST(ts AS DATE)) AS hi
        FROM events
    ), daily AS (
        SELECT event_type, CAST(ts AS DATE) AS d, COUNT(*) AS x
        FROM events GROUP BY 1, 2
    ), spine AS (
        SELECT t.event_type,
               CAST(UNNEST(GENERATE_SERIES(b.lo, b.hi, INTERVAL 1 DAY))
                    AS DATE) AS d
        FROM (SELECT DISTINCT event_type FROM daily) t CROSS JOIN bounds b
    ), filled AS (
        SELECT s.event_type, s.d, COALESCE(daily.x, 0) AS x
        FROM spine s LEFT JOIN daily
          ON daily.event_type = s.event_type AND daily.d = s.d
    ), c AS (
        SELECT f.event_type, f.d - b.lo AS t,
               st.n * f.x - st.s AS c
        FROM filled f
        CROSS JOIN bounds b
        JOIN (SELECT event_type, SUM(x) AS s, COUNT(*) AS n
              FROM filled GROUP BY 1) st
          ON st.event_type = f.event_type
    ), den AS (
        SELECT event_type, CAST(SUM(c * c) AS BIGINT) AS acf_den
        FROM c GROUP BY 1
    ), num AS (
        SELECT a.event_type, l.lag,
               CAST(SUM(a.c * b.c) AS BIGINT) AS acf_num
        FROM c a
        CROSS JOIN (SELECT UNNEST(GENERATE_SERIES(1, 7)) AS lag) l
        JOIN c b ON b.event_type = a.event_type AND b.t = a.t + l.lag
        GROUP BY 1, 2
    )
    SELECT n.event_type, CAST(n.lag AS BIGINT) AS lag,
           n.acf_num, d.acf_den,
           ROUND(CAST(n.acf_num AS DOUBLE) / CAST(d.acf_den AS DOUBLE), 6)
               AS acf_r
    FROM num n JOIN den d ON d.event_type = n.event_type
    WHERE d.acf_den > 0
    """,
)
def q_ts_autocorr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lag-1..7 sample autocorrelation of each event type's DAILY count
    series, gap-filled to the global calendar — the seasonality probe
    (weekly periodicity shows as a lag-7 peak) behind forecasting and
    anomaly baselines.

    Exactness: the ACF ratio's numerator and denominator are computed as
    EXACT integers by clearing the mean's denominator — with S = sum(x),
    n = days, the centered series is c_t = n*x_t - S (an integer), and
    r_k = sum(c_t * c_{t+k}) / sum(c_t^2) holds because the n^2 factor
    cancels. Both engines aggregate exact WIDE integers (Spark
    DECIMAL(38,0), DuckDB HUGEINT — order-immune; a raw BIGINT sum would
    wrap/diverge past 2^63 at production volumes), the reported ratio is
    one IEEE division of exact integers, and the raw num/den BIGINT
    columns ride along so downstream math can stay exact. The final
    BIGINT cast is GUARDED: Spark's default non-ANSI decimal->bigint
    overflow is a silent NULL (DuckDB raises), so the cast runs under an
    explicit raise_error null-check — overflow past 2^63 fails loudly in
    both engines instead of diverging silently (advisor catch, r6).

    Scale shape: the raw scan collapses to |types| x |days| rows FIRST
    (map-side combine); the spine, stats join, and the 7-lag self-join all
    run on that KB-sized frame — same two-tier shape as q_ts_ewma. The
    lag join is an equi-join on (type, t + lag); no window over raw rows.
    """
    ev = load_table(spark, sf_dir, "events")
    filled, bounds = _daily_gapfilled(ev)
    stats = filled.groupBy("event_type").agg(
        F.sum("x").alias("s"), F.count(F.lit(1)).alias("n")
    )
    c = (
        filled.crossJoin(F.broadcast(bounds))
        .join(F.broadcast(stats), "event_type")
        .select(
            "event_type",
            F.datediff("d", "lo").cast("bigint").alias("t"),
            (F.col("n") * F.col("x") - F.col("s")).alias("c"),
        )
    )
    # Accumulate c*c / c_t*c_{t+k} in DECIMAL(38,0), not BIGINT: at
    # production volumes (years of days x 1e6-scale daily deviations)
    # sum(c^2) passes 2^63, where a BIGINT sum wraps or raises while
    # DuckDB's HUGEINT keeps going — the engines would diverge exactly
    # when exactness matters (review catch; the exact_sum lesson).
    dec = lambda col: col.cast("decimal(38,0)")  # noqa: E731

    def loud_bigint(col, name):
        # Non-ANSI Spark turns decimal->bigint overflow into a silent
        # NULL while DuckDB's HUGEINT->BIGINT raises — guard the cast so
        # overflow past 2^63 FAILS in both engines (advisor catch, r6).
        # try_cast yields NULL-on-overflow under EITHER ansi setting, so
        # the guard (and its message) is deterministic across configs.
        b = col.try_cast("bigint")
        return (
            F.when(
                col.isNotNull() & b.isNull(),
                F.raise_error(
                    F.lit(f"{name} overflows BIGINT (exceeds 2^63)")
                ).cast("bigint"),
            )
            .otherwise(b)
            .alias(name)
        )

    den = c.groupBy("event_type").agg(
        loud_bigint(
            F.sum(dec(F.col("c")) * dec(F.col("c"))), "acf_den"
        )
    )
    lags = spark.range(1, 8).select(F.col("id").alias("lag"))
    a, b = c.alias("a"), c.alias("b")
    num = (
        a.crossJoin(F.broadcast(lags))
        .join(
            b,
            (F.col("b.event_type") == F.col("a.event_type"))
            & (F.col("b.t") == F.col("a.t") + F.col("lag")),
        )
        .groupBy(F.col("a.event_type").alias("event_type"), "lag")
        .agg(
            loud_bigint(
                F.sum(dec(F.col("a.c")) * dec(F.col("b.c"))), "acf_num"
            )
        )
    )
    return (
        num.join(den, "event_type")
        .filter(F.col("acf_den") > 0)
        .select(
            "event_type",
            "lag",
            "acf_num",
            "acf_den",
            F.round(
                F.col("acf_num").cast("double")
                / F.col("acf_den").cast("double"),
                6,
            ).alias("acf_r"),
        )
    )


@query(
    "q_events_pattern",
    oracle="""
    WITH s AS (
        SELECT user_id, ts, event_type,
               LEAD(event_type, 1) OVER w AS t1,
               LEAD(event_type, 2) OVER w AS t2,
               LEAD(ts, 2) OVER w AS ts2
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    SELECT user_id,
           COUNT(*) AS n_matches,
           CAST(MIN(epoch_us(ts)) AS BIGINT) AS first_match_us,
           CAST(SUM(epoch_us(ts2) - epoch_us(ts)) AS BIGINT) AS total_span_us
    FROM s
    WHERE event_type = 'view' AND t1 = 'click' AND t2 = 'purchase'
    GROUP BY user_id
    """,
)
def q_events_pattern(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence-pattern detection (MATCH_RECOGNIZE ``PATTERN (A B C)`` /
    CEP): per user, find every view -> click -> purchase run of three
    CONSECUTIVE events in time order, with overlap allowed (AFTER MATCH
    SKIP TO NEXT ROW) — the complex-event-processing primitive Spark has
    no MATCH_RECOGNIZE clause for, expressed as a lead-chain: a fixed
    k-step pattern is k-1 LEADs over one per-user sort, evaluated in a
    single window stage (one shuffle on user_id — no self-joins, no
    per-user iteration). Ordering is total ((ts, event_id); event_id
    unique), so matches are engine- and partition-stable.

    A variable-length pattern (A B+ C) becomes the same sort plus a
    gaps-and-islands pass (q_scd2_intervals' machinery) — documented
    extension, not needed for the fixed-k case.
    """
    from ..tables import epoch_us

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    s = ev.select(
        "user_id",
        "ts",
        "event_type",
        F.lead("event_type", 1).over(w).alias("t1"),
        F.lead("event_type", 2).over(w).alias("t2"),
        F.lead("ts", 2).over(w).alias("ts2"),
    )
    return (
        s.filter(
            (F.col("event_type") == "view")
            & (F.col("t1") == "click")
            & (F.col("t2") == "purchase")
        )
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_matches"),
            F.min(epoch_us("ts")).cast("bigint").alias("first_match_us"),
            F.sum(epoch_us("ts2") - epoch_us("ts"))
            .cast("bigint")
            .alias("total_span_us"),
        )
    )


@query(
    "q_ts_cusum",
    oracle="""
    WITH bounds AS (
        SELECT MIN(CAST(ts AS DATE)) AS lo, MAX(CAST(ts AS DATE)) AS hi
        FROM events
    ), daily AS (
        SELECT event_type, CAST(ts AS DATE) AS d, COUNT(*) AS x
        FROM events GROUP BY 1, 2
    ), spine AS (
        SELECT t.event_type,
               CAST(UNNEST(GENERATE_SERIES(b.lo, b.hi, INTERVAL 1 DAY))
                    AS DATE) AS d
        FROM (SELECT DISTINCT event_type FROM daily) t CROSS JOIN bounds b
    ), filled AS (
        SELECT s.event_type, s.d, COALESCE(daily.x, 0) AS x
        FROM spine s LEFT JOIN daily
          ON daily.event_type = s.event_type AND daily.d = s.d
    ), c AS (
        SELECT f.event_type, f.d,
               st.n * f.x - st.s AS cdev, st.n AS n
        FROM filled f
        JOIN (SELECT event_type, SUM(x) AS s, COUNT(*) AS n
              FROM filled GROUP BY 1) st
          ON st.event_type = f.event_type
    ), r AS (
        SELECT event_type, d, n,
               CAST(SUM(cdev) OVER w AS BIGINT) AS run
        FROM c
        WINDOW w AS (PARTITION BY event_type ORDER BY d
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    )
    SELECT event_type, STRFTIME(d, '%Y-%m-%d') AS day,
           run - LEAST(CAST(0 AS BIGINT),
                       CAST(MIN(run) OVER w AS BIGINT)) AS cusum,
           CAST(run - LEAST(CAST(0 AS BIGINT),
                            CAST(MIN(run) OVER w AS BIGINT))
                > 3 * n AS BIGINT) AS burst
    FROM r
    WINDOW w AS (PARTITION BY event_type ORDER BY d
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    """,
)
def q_ts_cusum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM burst/change-point detection over each event type's daily
    count series — the classic one-sided cumulative-sum chart
    s_t = max(0, s_{t-1} + (x_t - mean)).

    The max(0, ...) RECURRENCE is not an associative aggregate, but its
    closed form is: s_t = R_t - min(0, min_{j<=t} R_j) with R the plain
    running sum of deviations — so the whole detector is TWO stacked
    window functions over one sort, no recursion, no UDF, and both
    engines compute it identically. Deviations use the same
    denominator-clearing trick as q_ts_autocorr (c_t = n*x_t - S is an
    exact BIGINT; every comparison scales by n), so the chart is
    bit-exact cross-engine. Burst fires when the chart exceeds 3 units
    of daily count (3*n in scaled units).

    Scale shape: the raw scan collapses to |types| x |days| rows first;
    both windows share one (event_type) partitioning — a single
    KB-sized sort at any corpus size.
    """
    ev = load_table(spark, sf_dir, "events")
    filled, _bounds = _daily_gapfilled(ev)
    stats = filled.groupBy("event_type").agg(
        F.sum("x").alias("s"), F.count(F.lit(1)).alias("n")
    )
    c = filled.join(F.broadcast(stats), "event_type").select(
        "event_type",
        "d",
        "n",
        (F.col("n") * F.col("x") - F.col("s")).alias("cdev"),
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("d")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    r = c.withColumn("run", F.sum("cdev").over(w).cast("bigint"))
    cusum = F.col("run") - F.least(
        F.lit(0).cast("bigint"), F.min("run").over(w).cast("bigint")
    )
    return r.select(
        "event_type",
        F.date_format("d", "yyyy-MM-dd").alias("day"),
        cusum.alias("cusum"),
        (cusum > 3 * F.col("n")).cast("bigint").alias("burst"),
    )


@query(
    "q_ts_seasonality",
    oracle="""
    WITH bounds AS (
        SELECT MIN(CAST(ts AS DATE)) AS lo, MAX(CAST(ts AS DATE)) AS hi
        FROM events
    ), daily AS (
        SELECT event_type, CAST(ts AS DATE) AS d, COUNT(*) AS x
        FROM events GROUP BY 1, 2
    ), spine AS (
        SELECT t.event_type,
               CAST(UNNEST(GENERATE_SERIES(b.lo, b.hi, INTERVAL 1 DAY))
                    AS DATE) AS d
        FROM (SELECT DISTINCT event_type FROM daily) t CROSS JOIN bounds b
    ), filled AS (
        SELECT s.event_type, s.d, COALESCE(daily.x, 0) AS x,
               CAST(ISODOW(s.d) AS BIGINT) AS dow
        FROM spine s LEFT JOIN daily
          ON daily.event_type = s.event_type AND daily.d = s.d
    ), tot AS (
        SELECT event_type, SUM(x) AS s, COUNT(*) AS n
        FROM filled GROUP BY 1
    )
    SELECT f.event_type, f.dow,
           CAST(COUNT(*) AS BIGINT) AS days_n,
           CAST(SUM(f.x) AS BIGINT) AS sum_x,
           CAST(SUM(f.x) * t.n * 1000000
                // (COUNT(*) * t.s) AS BIGINT) AS idx_ppm
    FROM filled f JOIN tot t ON t.event_type = f.event_type
    GROUP BY f.event_type, f.dow, t.n, t.s
    """,
)
def q_ts_seasonality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekday seasonality indices: for each (event type, ISO weekday),
    the mean daily count relative to the type's overall mean, in exact
    ppm — idx 1,000,000 = flat; the multiplicative seasonal factors a
    forecaster divides out. Completes the exact time-series toolkit
    (EWMA, lag-k ACF, CUSUM, seasonal indices) on the gap-filled
    calendar (zero days count — a weekday that never fires is signal).

    Exactness: idx = (sum_w / days_w) / (S / n) clears all denominators
    into ONE integer expression sum_w * n * 1e6 div (days_w * S) —
    integer division on both engines (Spark `div`, DuckDB `//`,
    non-negative operands so floor == trunc). Weekday parity: Spark
    weekday()+1 == DuckDB ISODOW (Monday=1..7) — the cross-engine trap
    with dayofweek (Sunday=1 vs Sunday=0) never enters.

    Scale shape: identical two-tier plan to the other ts operators —
    the scan collapses to |types| x |days| first.
    """
    ev = load_table(spark, sf_dir, "events")
    gf, _bounds = _daily_gapfilled(ev)
    filled = gf.select(
        "event_type",
        (F.weekday("d") + 1).cast("bigint").alias("dow"),
        "x",
    )
    tot = filled.groupBy("event_type").agg(
        F.sum("x").alias("s"), F.count(F.lit(1)).alias("n")
    )
    return (
        filled.groupBy("event_type", "dow")
        .agg(
            F.count(F.lit(1)).alias("days_n"),
            F.sum("x").cast("bigint").alias("sum_x"),
        )
        .join(F.broadcast(tot), "event_type")
        .select(
            "event_type",
            "dow",
            F.col("days_n").cast("bigint"),
            "sum_x",
            F.expr("sum_x * n * 1000000 div (days_n * s)")
            .cast("bigint")
            .alias("idx_ppm"),
        )
    )
