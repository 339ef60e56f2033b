"""Metadata-driven join planning — the consumer of the stats stack.

Everything the snapshot tables record at commit time (per-file row
counts, byte sizes, NDV sketches) exists to answer ONE production
question without scanning data: how should this join run? This module
is that consumer — the local twin of a cost-based optimizer's join
strategy rule (Spark's own CBO reads ANALYZE TABLE stats; an Iceberg
deployment reads manifests + puffin sketches the same way).

Decision rules (the ones Spark's JoinSelection applies, made explicit):

  * a side whose LIVE BYTES fit the broadcast threshold is broadcast —
    the build side ships once per executor and the big side never
    shuffles (at 100 TB, skipping the big-side exchange IS the win);
  * both sides big -> shuffle join, and the expected rows-per-key
    (row count / key NDV, both from metadata) says whether the build
    side's hash table per key group stays sane — a low-NDV key is the
    skew flag that calls for salting (q_join_skew_salted's machinery)
    before the shuffle, something byte sizes alone can never reveal;
  * every input is METADATA: manifest byte sizes (os.stat over the
    live file list), footer row counts (stats sidecar), HLL NDV
    (ndv sidecar). Zero data IO to plan — the table need only be
    maintained (stats_cols/ndv_cols), exactly Iceberg's contract.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ..tables import exact_sum, load_table

# Spark's spark.sql.autoBroadcastJoinThreshold default
BROADCAST_THRESHOLD_BYTES = 10 * 1024 * 1024
# avg rows per key above which a shuffle join should salt the key
SKEW_ROWS_PER_KEY = 1_000


def table_bytes(tbl) -> int:
    """Live bytes of a snapshot table from the manifest file list —
    one os.stat per live file, no data IO (Iceberg's manifests carry
    file_size_in_bytes; the local twin stats the immutable files)."""
    v = tbl._resolve_snapshot(None)
    return sum(
        os.path.getsize(os.path.join(tbl.path, rel))
        for rel in tbl._manifest(v)
    )


def advise_join(
    spark: SparkSession,
    left,
    right,
    left_key: str,
    right_key: str | None = None,
    broadcast_bytes: int = BROADCAST_THRESHOLD_BYTES,
    full: bool = False,
) -> dict:
    """Pick the join strategy for ``left JOIN right ON left_key =
    right_key`` (``right_key`` defaults to ``left_key``) from table
    METADATA alone. Returns a dict with the decision and every input
    that produced it::

        {"strategy": "broadcast_left" | "broadcast_right" | "shuffle",
         "salt_advice": bool,              # shuffle only
         "left": {"bytes": .., "rows": .., "rows_meta": bool,
                  "ndv": .., "ndv_meta": bool},
         "right": {...}}

    ``rows``/``ndv`` fall back to exact scans on unmaintained tables
    (the *_meta flags say which path answered). They are computed
    LAZILY: byte sizes alone settle the broadcast case, and reading
    row counts / NDV there would trigger the fallback scans on an
    unmaintained big side for a decision that uses neither (review
    catch — the "metadata-only planner" scanned petabytes it never
    consulted). ``full=True`` forces the complete cost picture (the
    provenance the oracled query claims; zero extra IO on maintained
    tables)."""
    right_key = right_key or left_key
    sides = {
        "left": {"bytes": table_bytes(left)},
        "right": {"bytes": table_bytes(right)},
    }

    def _cost(name, tbl, key):
        if "rows" in sides[name]:
            return
        rows, n_meta = tbl.count_rows(spark)
        n_files = len(tbl._manifest(tbl._resolve_snapshot(None)))
        ndv, ndv_meta = tbl.ndv(spark, key)
        sides[name].update(
            rows=rows,
            rows_meta=n_meta == n_files,
            ndv=ndv,
            ndv_meta=ndv_meta,
        )

    lb, rb = sides["left"]["bytes"], sides["right"]["bytes"]
    if min(lb, rb) <= broadcast_bytes:
        strategy = "broadcast_left" if lb <= rb else "broadcast_right"
        salt = False
    else:
        strategy = "shuffle"
        # rows-per-key on the LARGER side decides the salting call:
        # a shuffle join degrades when one reducer's key group holds
        # a disproportionate share, and rows/NDV is the metadata-only
        # proxy for that concentration
        name, tbl, key = (
            ("left", left, left_key)
            if lb >= rb
            else ("right", right, right_key)
        )
        _cost(name, tbl, key)
        big = sides[name]
        salt = big["ndv"] > 0 and (
            big["rows"] // big["ndv"] > SKEW_ROWS_PER_KEY
        )
    if full:
        _cost("left", left, left_key)
        _cost("right", right, right_key)
    return {"strategy": strategy, "salt_advice": salt, **sides}


def apply_advice(
    left_df: DataFrame, right_df: DataFrame, on, advice: dict
) -> DataFrame:
    """Execute the join the way the advice says (broadcast hint on the
    chosen side; a plain shuffle join otherwise — salting itself is
    q_join_skew_salted's machinery and stays the caller's move).
    ``on`` is anything DataFrame.join accepts (key name or Column)."""
    if advice["strategy"] == "broadcast_left":
        return F.broadcast(left_df).join(right_df, on)
    if advice["strategy"] == "broadcast_right":
        return left_df.join(F.broadcast(right_df), on)
    return left_df.join(right_df, on)


@query(
    "q_join_cost_advisor",
    oracle="""
    SELECT c.c_mktsegment AS mktsegment,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(ROUND(o.o_totalprice * 100) AS BIGINT))
                AS DOUBLE) / 100.0 AS sum_price,
           CAST(1 AS BIGINT) AS broadcast_dim,
           CAST(1 AS BIGINT) AS decision_from_metadata
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    GROUP BY c.c_mktsegment
    """,
)
def q_join_cost_advisor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The stats stack CONSUMED: a fact table (orders) and a dimension
    (customer) land in snapshot tables maintaining row counts AND NDV
    sketches on the join key; ``advise_join`` reads ONLY metadata (live
    bytes, footer row counts, merged HLL) and picks the broadcast side;
    the join then runs exactly as advised and must reproduce the
    oracle's plain SQL join — the strategy changes the plan, never the
    result. Two decision claims ride along oracled: the dimension was
    chosen for broadcast, and every cost input came from metadata
    (zero data IO to plan — the reason ndv_cols/stats_cols exist).

    100 TB shape: this is the broadcast-vs-shuffle call a cost-based
    planner makes before EVERY join; making it from manifests instead
    of a COUNT(DISTINCT) scan is the difference between planning in
    milliseconds and planning by reading petabytes. The chosen plan is
    pinned as BroadcastHashJoin in tests/test_plans.py, along with the
    shuffle+salt advice on two big low-NDV sides."""
    from ..tables import scratch_dir

    path = scratch_dir(spark, sf_dir, "join_advisor")
    from ..sources.snapshots import SnapshotTable

    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    fact = SnapshotTable(
        os.path.join(path, "fact"),
        stats_cols=["o_custkey"],
        ndv_cols=["o_custkey"],
    )
    dim = SnapshotTable(
        os.path.join(path, "dim"),
        stats_cols=["c_custkey"],
        ndv_cols=["c_custkey"],
    )
    for r in range(2):
        fact.append(o.filter(F.col("o_orderkey") % 2 == r))
    dim.append(c)
    advice = advise_join(
        spark, fact, dim, "o_custkey", "c_custkey", full=True
    )
    result = (
        apply_advice(
            fact.read(spark),
            dim.read(spark),
            F.col("o_custkey") == F.col("c_custkey"),
            advice,
        )
        .groupBy(F.col("c_mktsegment").alias("mktsegment"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            exact_sum(F.col("o_totalprice"), 2).alias("sum_price"),
        )
    )
    from_meta = (
        advice["left"]["rows_meta"]
        and advice["right"]["rows_meta"]
        and advice["left"]["ndv_meta"]
        and advice["right"]["ndv_meta"]
    )
    return result.select(
        "mktsegment",
        "n_orders",
        "sum_price",
        F.lit(int(advice["strategy"] == "broadcast_right"))
        .cast("bigint")
        .alias("broadcast_dim"),
        F.lit(int(from_meta)).cast("bigint").alias(
            "decision_from_metadata"
        ),
    )
