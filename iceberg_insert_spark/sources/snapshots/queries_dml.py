"""Write-path and streaming queries over SnapshotTable (SURVEY.md §2.4c).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ...tables import tiny_df

from ...registry import query
from ...tables import exact_sum, load_table
from .core import SnapshotTable
from .incremental import read_changelog



@query(
    "q_snapshot_merge_into",
    oracle="""
    WITH t AS (
        SELECT o_orderkey, o_orderstatus, o_totalprice
        FROM orders WHERE o_orderkey % 2 = 0
    ),
    s AS (
        SELECT o_orderkey, o_totalprice
        FROM orders WHERE o_orderkey % 3 = 0
    ),
    merged AS (
        SELECT t.o_orderkey, t.o_orderstatus,
               CASE WHEN s.o_orderkey IS NOT NULL
                         AND t.o_orderstatus <> 'F'
                    THEN s.o_totalprice + 1
                    ELSE t.o_totalprice END AS o_totalprice
        FROM t LEFT JOIN s ON s.o_orderkey = t.o_orderkey
        WHERE NOT (s.o_orderkey IS NOT NULL AND t.o_orderstatus = 'F')
        UNION ALL
        SELECT s.o_orderkey, NULL AS o_orderstatus, s.o_totalprice
        FROM s LEFT JOIN t ON t.o_orderkey = s.o_orderkey
        WHERE t.o_orderkey IS NULL AND s.o_totalprice > 50000
    )
    SELECT COALESCE(o_orderstatus, '<inserted>') AS status,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
               AS cents
    FROM merged GROUP BY 1
    """,
)
def q_snapshot_merge_into(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full MERGE INTO clause semantics (Spark SQL / Iceberg
    ``WHEN MATCHED [AND cond] THEN DELETE / UPDATE SET ... WHEN NOT
    MATCHED [AND cond] THEN INSERT``), DuckDB-oracled: target = even
    order keys; source = keys %3==0. Clauses, first-match-wins exactly
    like SQL: matched rows with status 'F' are DELETED; remaining
    matched rows UPDATE o_totalprice to the source value + 1 while the
    UNASSIGNED status column keeps the TARGET's value (SET semantics);
    unmatched source rows INSERT only when their price clears 50000,
    with the status column they don't carry filled NULL. The engine
    derives the I/U/D changelog from two joins and commits it through
    ``merge`` as ONE snapshot (equality-deletes + data files in a
    single manifest swap); the oracle reconstructs the final state
    with plain LEFT JOIN algebra. Ambiguous merges (a target key hit
    by two source rows) are refused — Spark's
    MERGE_CARDINALITY_VIOLATION — pinned in tests/test_snapshots.py.

    Scale shape: the clause join probes the target with the
    CDC-batch-sized source (broadcast), the insert anti-join reads a
    column-pruned key scan, and the commit is O(|changelog|) — no
    target file rewritten, the Iceberg v2 delete-file trade.
    """
    from ...tables import scratch_dir

    path = scratch_dir(spark, sf_dir, "snap_merge_into")
    o = load_table(spark, sf_dir, "orders")
    k = F.col("o_orderkey")
    tbl = SnapshotTable(path)
    tbl.append(
        o.filter(k % 2 == 0).select(
            "o_orderkey", "o_orderstatus", "o_totalprice"
        )
    )
    src = o.filter(k % 3 == 0).select("o_orderkey", "o_totalprice")
    tbl.merge_into(
        spark,
        src,
        key="o_orderkey",
        matched=[
            ("delete", "t.o_orderstatus = 'F'"),
            ("update", None, {"o_totalprice": "s.o_totalprice + 1"}),
        ],
        not_matched=("insert", "s.o_totalprice > 50000"),
    )
    return (
        tbl.read(spark)
        .groupBy(
            F.coalesce("o_orderstatus", F.lit("<inserted>")).alias(
                "status"
            )
        )
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(
                F.round(F.col("o_totalprice") * 100).cast("bigint")
            )
            .cast("bigint")
            .alias("cents"),
        )
    )


@query(
    "q_snapshot_merge",
    oracle="""
    WITH base AS (
        SELECT o_orderkey, o_orderstatus, o_totalprice
        FROM orders WHERE o_orderkey % 3 < 2
    ),
    merged AS (
        SELECT o_orderkey, o_orderstatus, o_totalprice FROM base
        WHERE o_orderkey % 7 NOT IN (1, 3)
        UNION ALL
        SELECT o_orderkey, o_orderstatus, o_totalprice * 2 FROM base
        WHERE o_orderkey % 7 = 1
        UNION ALL
        SELECT o_orderkey, o_orderstatus, o_totalprice
        FROM orders WHERE o_orderkey % 3 = 2
    )
    SELECT o_orderstatus, COUNT(*) AS n_orders,
           CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS DOUBLE)
               / 100.0 AS sum_price
    FROM merged GROUP BY o_orderstatus
    """,
)
def q_snapshot_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE INTO as one atomic snapshot (Iceberg v2's CDC write path),
    DuckDB-oracled end-to-end: base = orders keys with %3 < 2; a CDC
    changelog then DELETEs base keys with %7 == 3, UPDATEs base keys
    with %7 == 1 to doubled totalprice, and INSERTs the held-out
    %3 == 2 keys — applied by ``SnapshotTable.merge`` as ONE commit
    writing an equality-delete file (U∪D keys) plus data files (I∪U
    row images). The latest read is merge-on-read (broadcast anti-join
    with the seq-visibility rule: deletes apply only to older data, so
    the merge's own re-inserts survive), and must equal the oracle's
    full rebuild of the same changelog. The doubled price is exact IEEE
    in both engines. Multi-merge chains, compaction folding the delete
    files, and expire reclaiming them are pinned in
    tests/test_snapshots.py.

    100 TB shape: the merge writes O(|changelog|) bytes — no
    copy-on-write rewrite of touched data files; readers pay one
    broadcast hash anti-join (delete keys are dimension-sized) until
    ``compact`` folds the deletes back into data. The reference can
    only blind-append (App.java:147-149).
    """
    from ...tables import scratch_dir

    path = scratch_dir(spark, sf_dir, "snapshot_merge")
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    k = F.col("o_orderkey")
    tbl = SnapshotTable(path)
    base = o.filter(k % 3 < 2)
    tbl.append(base)
    changelog = (
        base.filter(k % 7 == 3)
        .withColumn("_op", F.lit("D"))
        .unionByName(
            base.filter(k % 7 == 1)
            .withColumn("o_totalprice", F.col("o_totalprice") * 2)
            .withColumn("_op", F.lit("U"))
        )
        .unionByName(
            o.filter(k % 3 == 2).withColumn("_op", F.lit("I"))
        )
    )
    tbl.merge(spark, changelog, key="o_orderkey", _ops_validated=True)
    return (
        tbl.read(spark)
        .groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            exact_sum(F.col("o_totalprice"), 2).alias("sum_price"),
        )
    )


@query(
    "q_snapshot_overwrite_partitions",
    oracle="""
    WITH final AS (
        SELECT o_orderkey, o_orderstatus, o_totalprice
        FROM orders WHERE o_orderstatus <> 'F'
        UNION ALL
        SELECT o_orderkey, o_orderstatus, o_totalprice * 2
        FROM orders WHERE o_orderstatus = 'F'
    )
    SELECT TRUE AS partition_pruned, o_orderstatus,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS DOUBLE)
               / 100.0 AS sum_price
    FROM final GROUP BY o_orderstatus
    """,
)
def q_snapshot_overwrite_partitions(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """DYNAMIC PARTITION OVERWRITE as one atomic snapshot (Iceberg's
    ``replacePartitions`` — the daily-reload/backfill shape),
    DuckDB-oracled end-to-end: the table is partitioned by
    o_orderstatus; snapshot 1 loads all orders (files split per
    partition, tuples recorded in the manifest); a corrected 'F' batch
    (doubled totalprice) then replaces EXACTLY the 'F' partition —
    ``overwrite_partitions`` inherits every other partition's files
    untouched (no rewrite, no copy) and swaps in the new 'F' files in
    one manifest commit. The latest read must equal the oracle's
    rebuild (non-F unchanged + F doubled; doubling is exact IEEE both
    engines). `partition_pruned` additionally pins MANIFEST partition
    pruning: planning a single-partition read keeps strictly fewer
    files than the snapshot total without opening any data file. File
    identity of untouched partitions, time travel to the pre-reload
    state, and expiry of the replaced files are pinned in
    tests/test_snapshots.py.

    100 TB shape: the reload writes O(|batch|) and commits metadata —
    the other 10,000 partitions are inherited by reference; a
    partition-predicated read plans from the manifest's partition
    tuples alone. This is the bread-and-butter warehouse operation
    (idempotent daily re-load) the reference's blind append
    (App.java:147-149) turns into duplicate data.
    """
    from ...tables import scratch_dir

    path = scratch_dir(spark, sf_dir, "snapshot_dyn_overwrite")
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    tbl = SnapshotTable(path, partition_by=["o_orderstatus"])
    tbl.append(o)
    reload_f = o.filter(F.col("o_orderstatus") == "F").withColumn(
        "o_totalprice", F.col("o_totalprice") * 2
    )
    tbl.overwrite_partitions(reload_f)
    kept, total = tbl.plan_files(partitions={"o_orderstatus": "O"})
    pruned = len(kept) < total
    return (
        tbl.read(spark)
        .groupBy("o_orderstatus")
        .agg(
            F.lit(pruned).alias("partition_pruned"),
            F.count(F.lit(1)).alias("n_orders"),
            exact_sum(F.col("o_totalprice"), 2).alias("sum_price"),
        )
        .select("partition_pruned", "o_orderstatus", "n_orders", "sum_price")
    )


@query(
    "q_snapshot_changelog",
    oracle="""
    WITH base AS (
        SELECT o_orderkey, o_orderstatus, o_totalprice
        FROM orders WHERE o_orderkey % 3 < 2
    ),
    changes AS (
        SELECT 'delete' AS change_type, o_orderstatus, o_totalprice
        FROM base WHERE o_orderkey % 7 IN (1, 3)
        UNION ALL
        SELECT 'insert', o_orderstatus, o_totalprice * 2
        FROM base WHERE o_orderkey % 7 = 1
        UNION ALL
        SELECT 'insert', o_orderstatus, o_totalprice
        FROM orders WHERE o_orderkey % 3 = 2
    )
    SELECT change_type, o_orderstatus, COUNT(*) AS n_rows,
           CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS DOUBLE)
               / 100.0 AS sum_price
    FROM changes GROUP BY change_type, o_orderstatus
    """,
)
def q_snapshot_changelog(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC changelog READ over a merge commit (Iceberg's
    ``create_changelog_view``), DuckDB-oracled end-to-end: the same
    base + changelog as q_snapshot_merge (base = keys %3 < 2; DELETE
    %7==3, UPDATE %7==1 to doubled price, INSERT %3==2), then
    ``read_changelog(1, 2)`` must emit exactly the update's
    delete(old image)+insert(new image) pair, the delete's old image,
    and the inserts — which the oracle reconstructs directly from the
    changelog definition. Proves the merge write path and the changelog
    read path are inverses on the manifest metadata alone. Intra-range
    add-then-delete suppression is pinned in tests/test_snapshots.py.
    """
    from ...tables import scratch_dir

    path = scratch_dir(spark, sf_dir, "snapshot_changelog")
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    k = F.col("o_orderkey")
    tbl = SnapshotTable(path)
    base = o.filter(k % 3 < 2)
    tbl.append(base)
    changelog = (
        base.filter(k % 7 == 3)
        .withColumn("_op", F.lit("D"))
        .unionByName(
            base.filter(k % 7 == 1)
            .withColumn("o_totalprice", F.col("o_totalprice") * 2)
            .withColumn("_op", F.lit("U"))
        )
        .unionByName(
            o.filter(k % 3 == 2).withColumn("_op", F.lit("I"))
        )
    )
    tbl.merge(spark, changelog, key="o_orderkey", _ops_validated=True)
    return (
        read_changelog(tbl, spark, 1, 2)
        .groupBy(
            F.col("_change_type").alias("change_type"), "o_orderstatus"
        )
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            exact_sum(F.col("o_totalprice"), 2).alias("sum_price"),
        )
    )


@query(
    "q_snapshot_delete_where",
    oracle="""
    SELECT o_orderstatus,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))
                AS DOUBLE) / 100.0 AS sum_price
    FROM orders
    WHERE NOT (o_orderkey BETWEEN 1000 AND 4000
               AND o_orderstatus = 'F')
    GROUP BY o_orderstatus
    """,
)
def q_snapshot_delete_where(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-level ``DELETE FROM ... WHERE`` as one copy-on-write
    snapshot, DuckDB-oracled end-to-end: the table is laid out in three
    files covering DISJOINT o_orderkey ranges (the sorted-compaction
    layout), so the delete's ``stats_hint`` range [1000, 4000] prunes
    the higher-range files from the planning scan entirely — they are
    carried into the new manifest without being opened, which
    tests/test_snapshots.py pins by path identity. The oracle rebuilds
    the post-delete state with ``WHERE NOT (...)`` over the same
    parquet, so a lost row, a row deleted twice, a NULL-condition row
    wrongly dropped, or a kept file leaking deleted rows all
    hash-mismatch.

    Scale shape: DELETE cost is O(files containing matches), not
    O(table) — the manifest stats bound the planning scan and
    ``input_file_name()`` narrows to truly-touched files, so a
    retention sweep over a date-clustered 100 TB table rewrites only
    the expiring date range's files.
    """
    from ...tables import require_local_master, scratch_dir

    require_local_master(spark, "q_snapshot_delete_where (footer stats)")
    path = scratch_dir(spark, sf_dir, "snapshot_delete_where")
    o = load_table(spark, sf_dir, "orders")
    tbl = SnapshotTable(path, stats_cols=["o_orderkey"])
    tbl.append(o.filter(F.col("o_orderkey") < 5000).coalesce(1))
    tbl.append(
        o.filter(
            (F.col("o_orderkey") >= 5000) & (F.col("o_orderkey") < 10000)
        ).coalesce(1)
    )
    tbl.append(o.filter(F.col("o_orderkey") >= 10000).coalesce(1))
    tbl.delete_where(
        spark,
        "o_orderkey BETWEEN 1000 AND 4000 AND o_orderstatus = 'F'",
        stats_hint=("o_orderkey", 1000, 4000),
    )
    return (
        tbl.read(spark)
        .groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            exact_sum(F.col("o_totalprice"), 2).alias("sum_price"),
        )
    )


@query(
    "q_snapshot_update_where",
    oracle="""
    SELECT CASE WHEN o_orderkey % 7 = 0
                THEN 'R:' || o_orderpriority
                ELSE o_orderpriority END AS o_orderpriority,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))
                AS DOUBLE) / 100.0 AS sum_price
    FROM orders
    GROUP BY 1
    """,
)
def q_snapshot_update_where(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-level ``UPDATE ... SET ... WHERE`` as one copy-on-write
    snapshot: every seventh order is re-prioritized (the SET expression
    reads the OLD row image), all other rows in touched files are
    rewritten byte-identical, and the oracle recomputes the same
    mutation with a CASE over the raw parquet — so a row updated twice,
    a non-matching row mutated, or a dropped row all hash-mismatch. The
    per-status money sum proves the untouched columns survive the
    rewrite exactly.

    Scale shape: same CoW plan as DELETE — plan from manifest stats,
    narrow by input_file_name, rewrite only touched files; a
    backfill-style UPDATE over a clustered predicate is O(matching
    files), and readers see the whole UPDATE or none of it (one
    manifest swap).
    """
    from ...tables import scratch_dir

    path = scratch_dir(spark, sf_dir, "snapshot_update_where")
    o = load_table(spark, sf_dir, "orders")
    tbl = SnapshotTable(path)
    tbl.append(o)
    tbl.update_where(
        spark,
        "o_orderkey % 7 = 0",
        {"o_orderpriority": "concat('R:', o_orderpriority)"},
    )
    return (
        tbl.read(spark)
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            exact_sum(F.col("o_totalprice"), 2).alias("sum_price"),
        )
    )


@query(
    "q_snapshot_add_files",
    oracle="""
    SELECT o_orderstatus,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))
                AS DOUBLE) / 100.0 AS sum_price
    FROM orders
    GROUP BY o_orderstatus
    """,
)
def q_snapshot_add_files(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Iceberg ``add_files`` / ``migrate`` — adopting an EXISTING
    parquet warehouse into the snapshot table as a metadata commit,
    DuckDB-oracled: the raw ``orders.parquet`` driver file is
    registered without reading or rewriting a row (hard-link into the
    table layout; tests pin inode identity), and the snapshot read
    must reproduce the source exactly — a dropped file, a double
    registration, or a schema mix-up all hash-mismatch against the
    oracle's direct scan of the same parquet.

    Scale shape: migrating a 100 TB hive warehouse into the table
    format costs O(files) metadata operations and ZERO data movement —
    the operation every adoption story starts with; after import the
    files participate in time travel, expire reachability, CoW
    deletes, and streaming like natively-written data.
    """
    from ...tables import scratch_dir

    path = scratch_dir(spark, sf_dir, "snapshot_add_files")
    tbl = SnapshotTable(path)
    tbl.add_files(spark, [os.path.join(sf_dir, "orders.parquet")])
    return (
        tbl.read(spark)
        .groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            exact_sum(F.col("o_totalprice"), 2).alias("sum_price"),
        )
    )


@query(
    "q_snapshot_stream",
    oracle="""
    SELECT CAST(o_orderkey % 3 + 1 AS BIGINT) AS snapshot,
           COUNT(*) AS n_rows
    FROM orders
    GROUP BY 1
    """,
)
def q_snapshot_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The snapshot table as a STREAMING SOURCE, DuckDB-oracled: three
    appends (the %3 classes of orders) must arrive as exactly three
    micro-batches — one per snapshot, each carrying exactly that
    commit's delta — and a RESTART of the loop against the same durable
    checkpoint must deliver NOTHING more. The returned rows are the
    consumed (snapshot, n_rows) pairs across BOTH runs, so a missed
    snapshot, a wrong delta (full-table re-read instead of new files),
    a split/merged batch, or any post-restart re-delivery all
    hash-mismatch against the oracle's per-class counts. Crash-replay
    at-least-once + downstream token dedup are pinned in
    tests/test_streaming.py.

    Scale shape: each micro-batch plans from the commit's ``new_files``
    summary — one manifest read, scan bounded by the delta — so a
    downstream training-data consumer tails a 100 TB table at the cost
    of its increments, never re-scanning history; the checkpoint is one
    atomic-rename JSON.
    """
    from ...tables import scratch_dir
    from ...streaming.file_stream import snapshot_stream_available_now

    base = scratch_dir(spark, sf_dir, "snapshot_stream")
    o = load_table(spark, sf_dir, "orders")
    tbl = SnapshotTable(f"{base}/t")
    for r in range(3):
        tbl.append(o.filter(F.col("o_orderkey") % 3 == r))
    got: list[tuple[int, int]] = []

    def sink(batch: DataFrame, v: int) -> None:
        got.append((v, batch.count()))

    ckpt = f"{base}/ckpt"
    snapshot_stream_available_now(spark, tbl, ckpt, sink)
    snapshot_stream_available_now(spark, tbl, ckpt, sink)  # restart: no-op
    return tiny_df(spark, got, "snapshot long, n_rows long")


@query(
    "q_snapshot_changelog_stream",
    oracle="""
    SELECT 1 AS snapshot, 'insert' AS change_type,
           COUNT(*) AS n_rows
    FROM orders WHERE o_orderkey % 3 = 0
    UNION ALL
    SELECT 2, 'delete', COUNT(*)
    FROM orders WHERE o_orderkey % 9 IN (0, 3)
    UNION ALL
    SELECT 2, 'insert', COUNT(*)
    FROM orders WHERE o_orderkey % 9 = 3
    UNION ALL
    SELECT 3, 'insert', COUNT(*)
    FROM orders WHERE o_orderkey % 3 = 1
    """,
)
def q_snapshot_changelog_stream(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """CDC STREAMING READ, DuckDB-oracled: an append, a MERGE (delete
    the %9==0 keys, double-price the %9==3 keys), and a second append
    must arrive as exactly three CHANGELOG micro-batches — the
    bootstrap as pure inserts, the merge as its delete old-images
    (U∪D keys) plus insert new-images (U rows), the append as inserts
    — and a checkpoint RESTART delivers nothing more. The returned
    rows are per-(batch, change_type) counts across BOTH runs, so a
    dropped delete, an update not split into its delete+insert pair,
    a full-table re-read, or post-restart re-delivery all
    hash-mismatch against the oracle's modulo-class reconstruction.
    This is the subscription primitive the append-only stream
    (q_snapshot_stream) correctly refuses to serve for merge commits.

    Scale shape: each batch reads the commit's own delta files plus a
    broadcast of its delete keys joined to the prior state — a CDC
    consumer (replica, index, incremental MV) tails a 100 TB table at
    the cost of its changes.
    """
    from ...streaming.file_stream import changelog_stream_available_now
    from ...tables import scratch_dir

    base = scratch_dir(spark, sf_dir, "snapshot_changelog_stream")
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    tbl = SnapshotTable(f"{base}/t")
    tbl.append(o.filter(F.col("o_orderkey") % 3 == 0))
    chg = (
        o.filter(F.col("o_orderkey") % 9 == 0)
        .withColumn("_op", F.lit("D"))
        .unionByName(
            o.filter(F.col("o_orderkey") % 9 == 3)
            .withColumn("o_totalprice", F.col("o_totalprice") * 2)
            .withColumn("_op", F.lit("U"))
        )
    )
    tbl.merge(spark, chg, key="o_orderkey", _ops_validated=True)
    tbl.append(o.filter(F.col("o_orderkey") % 3 == 1))

    got: list[tuple[int, str, int]] = []

    def sink(batch: DataFrame, v: int) -> None:
        for r in (
            batch.groupBy("_change_type").count().collect()
        ):
            got.append((v, r["_change_type"], r["count"]))

    ckpt = f"{base}/ckpt"
    changelog_stream_available_now(spark, tbl, ckpt, sink)
    changelog_stream_available_now(spark, tbl, ckpt, sink)  # restart
    return tiny_df(spark, 
        got, "snapshot long, change_type string, n_rows long"
    )


@query(
    "q_snapshot_delete_mor",
    oracle="""
    SELECT o_orderstatus,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))
                AS DOUBLE) / 100.0 AS sum_price
    FROM orders
    WHERE NOT (o_orderkey % 10 IN (3, 7) AND o_orderstatus <> 'O')
    GROUP BY o_orderstatus
    """,
)
def q_snapshot_delete_mor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Merge-on-read positional DELETE (Iceberg v2 position-delete
    files), DuckDB-oracled end-to-end: the same ``DELETE WHERE``
    semantics as the CoW path, but the commit writes ONLY a
    (data file, row position) delete file — zero data rewritten (the
    manifest's data files are identical before and after, pinned by
    path in tests/test_snapshots.py) — and the read's broadcast
    (file, pos) anti-join must reproduce exactly the oracle's
    ``WHERE NOT (...)`` over the same parquet. A position off by one,
    a row deleted from the wrong file, or an anti-join key mismatch
    all hash-mismatch.

    Scale shape: write cost is O(matching rows) — two columns per hit
    — regardless of file sizes; the read-side anti-join is
    delete-file-sized and broadcast until ``compact`` folds it. This
    is the delete trade CDC-heavy tables take between compactions;
    CoW (q_snapshot_delete_where) is the read-optimized alternative,
    and both compose with merge()'s equality deletes on one table.
    """
    from ...tables import scratch_dir

    path = scratch_dir(spark, sf_dir, "snapshot_delete_mor")
    o = load_table(spark, sf_dir, "orders")
    tbl = SnapshotTable(path)
    for r in range(2):
        tbl.append(o.filter(F.col("o_orderkey") % 2 == r))
    tbl.delete_where(
        spark,
        "o_orderkey % 10 IN (3, 7) AND o_orderstatus <> 'O'",
        strategy="mor",
    )
    return (
        tbl.read(spark)
        .groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            exact_sum(F.col("o_totalprice"), 2).alias("sum_price"),
        )
    )


@query(
    "q_snapshot_update_mor",
    oracle="""
    SELECT CASE WHEN o_orderkey % 11 = 0
                THEN 'M:' || o_orderpriority
                ELSE o_orderpriority END AS o_orderpriority,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))
                AS DOUBLE) / 100.0 AS sum_price
    FROM orders
    GROUP BY 1
    """,
)
def q_snapshot_update_mor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Merge-on-read UPDATE, DuckDB-oracled: the same simultaneous
    old-image UPDATE semantics as q_snapshot_update_where, through the
    POSITION-DELETE + new-image-files physical path — one commit whose
    position entries kill exactly the old copies while its own data
    files carry the updated rows (a double-visible row, a lost old
    image, or a new image killed by its own commit's entries all
    hash-mismatch the CASE rebuild). Zero untouched rows rewritten
    (path identity pinned in tests/test_snapshots.py).

    Scale shape: write cost O(matching rows) both sides (two columns
    per position entry + the new images), the CDC-friendly half of the
    UPDATE trade; reads pay the broadcast (file, pos) anti-join until
    ``compact`` folds it.
    """
    from ...tables import scratch_dir

    path = scratch_dir(spark, sf_dir, "snapshot_update_mor")
    o = load_table(spark, sf_dir, "orders")
    tbl = SnapshotTable(path)
    for r in range(2):
        tbl.append(o.filter(F.col("o_orderkey") % 2 == r))
    tbl.update_where(
        spark,
        "o_orderkey % 11 = 0",
        {"o_orderpriority": "concat('M:', o_orderpriority)"},
        strategy="mor",
    )
    return (
        tbl.read(spark)
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            exact_sum(F.col("o_totalprice"), 2).alias("sum_price"),
        )
    )


@query(
    "q_snapshot_delete_dv",
    oracle="""
    SELECT o_orderstatus,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))
                AS DOUBLE) / 100.0 AS sum_price
    FROM orders
    WHERE NOT (o_orderkey % 10 = 3)
      AND NOT (o_orderkey % 10 IN (4, 7) AND o_orderstatus <> 'O')
    GROUP BY o_orderstatus
    """,
)
def q_snapshot_delete_dv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DELETION VECTORS (Iceberg v3) under STACKED MoR deletes,
    DuckDB-oracled: two successive ``strategy='mor'`` deletes hit
    OVERLAPPING data files, so the second commit must UNION each
    touched file's prior bitmap and supersede it (v3's
    one-live-DV-per-file rule) — the read then folds exactly ONE
    bitmap per file, newest wins. The final state must equal the
    oracle's ``WHERE NOT c1 AND NOT c2`` over the same parquet: a
    union that drops the first delete's bits, a newest-pick that
    grabs the stale DV, or an off-by-one in the bitmap codec all
    resurrect or over-kill rows and hash-mismatch.

    Scale shape vs the v2 row-lists (q_snapshot_delete_mor's
    historical representation): read-side delete state is O(live
    files) — one compressed bitmap each — not O(delete commits), and
    the fold is a row-local Arrow-batched filter, not a broadcast
    anti-join whose build side grows with every delete. On a hot
    100 TB table taking continuous CDC deletes between compactions,
    that bound is the difference between a stable MoR read and one
    that degrades with churn. Cites Iceberg v3 spec (deletion
    vectors; puffin storage) re-expressed on the local snapshot twin.
    """
    from ...tables import scratch_dir

    path = scratch_dir(spark, sf_dir, "snapshot_delete_dv")
    o = load_table(spark, sf_dir, "orders")
    tbl = SnapshotTable(path)
    for r in range(2):
        tbl.append(o.filter(F.col("o_orderkey") % 2 == r))
    # first delete: touches both files (keys mod 10 = 3 live in both)
    tbl.delete_where(spark, "o_orderkey % 10 = 3", strategy="mor")
    # second delete: overlaps the same files — must fold the prior DVs
    tbl.delete_where(
        spark,
        "o_orderkey % 10 IN (4, 7) AND o_orderstatus <> 'O'",
        strategy="mor",
    )
    return (
        tbl.read(spark)
        .groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            exact_sum(F.col("o_totalprice"), 2).alias("sum_price"),
        )
    )


@query(
    "q_snapshot_delete_files",
    oracle="""
    SELECT o_orderstatus,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))
                AS BIGINT) AS cents,
           (SELECT CAST(COUNT(DISTINCT o_orderkey) AS BIGINT)
            FROM orders WHERE o_orderkey % 9 = 0) AS eq_entries,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM orders
            WHERE o_orderkey % 9 <> 0
              AND o_orderkey % 10 IN (3, 4)
              AND o_orderstatus <> 'O') AS dv_dead_rows,
           CAST(2 AS BIGINT) AS dv_files_covered
    FROM orders
    WHERE o_orderkey % 9 <> 0
      AND NOT (o_orderkey % 10 IN (3, 4) AND o_orderstatus <> 'O')
    GROUP BY o_orderstatus
    """,
)
def q_snapshot_delete_files(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ``.delete_files`` METADATA TABLE, DuckDB-oracled: a table
    carrying BOTH live delete kinds — an equality-delete file from a
    MERGE (every key ≡ 0 mod 9 deleted) and a deletion vector from a
    MoR delete over the survivors — reports, without decoding a single
    bitmap or scanning data, exactly the delete state a read folds:
    the eq file's entry count must equal the distinct deleted keys,
    the DV's recorded cardinality must equal the rows the second
    delete actually killed (matched AFTER the eq fold — a DV that
    re-counted eq-deleted rows would overstate), and the DV coverage
    list names both data files. The table content rides along as the
    oracled payload, proving the metadata describes the same state the
    read serves.

    100 TB: this is the MoR-health view an administrator checks before
    scheduling compaction — delete state per file, dead-row volume,
    and which files carry vectors, all from footers + manifest
    (KB-scale at any table size)."""
    from ...tables import scratch_dir

    path = scratch_dir(spark, sf_dir, "snapshot_delete_files")
    o = load_table(spark, sf_dir, "orders")
    tbl = SnapshotTable(path)
    for r in range(2):
        # one data file per parity append: the coverage claim (exactly
        # 2 files carry DV bits) is structural, not partitioning luck
        tbl.append(o.filter(F.col("o_orderkey") % 2 == r).coalesce(1))
    ch = (
        o.filter(F.col("o_orderkey") % 9 == 0)
        .select("o_orderkey")
        .withColumn("_op", F.lit("D"))
    )
    tbl.merge(spark, ch, key="o_orderkey", _ops_validated=True)
    # keys ≡ 3 (odd) and ≡ 4 (even) mod 10: the delete provably
    # touches BOTH parity files, so the coverage claim is deterministic
    tbl.delete_where(
        spark,
        "o_orderkey % 10 IN (3, 4) AND o_orderstatus <> 'O'",
        strategy="mor",
    )
    info = tbl.delete_files_info()
    eq_entries = sum(
        e["n_entries"] for e in info if e["kind"] == "eq"
    )
    dv_dead = sum(
        e.get("n_dead_rows", 0) for e in info if e["kind"] == "dv"
    )
    dv_covered = sum(
        e.get("files_covered", 0) for e in info if e["kind"] == "dv"
    )
    return (
        tbl.read(spark)
        .groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(
                F.round(F.col("o_totalprice") * 100).cast("bigint")
            )
            .cast("bigint")
            .alias("cents"),
        )
        .select(
            "o_orderstatus",
            "n_orders",
            "cents",
            F.lit(eq_entries).cast("bigint").alias("eq_entries"),
            F.lit(dv_dead).cast("bigint").alias("dv_dead_rows"),
            F.lit(dv_covered).cast("bigint").alias(
                "dv_files_covered"
            ),
        )
    )


@query(
    "q_snapshot_write_distribution",
    oracle="""
    SELECT o_orderstatus,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
               AS cents,
           CAST(1 AS BIGINT) AS one_file_per_partition,
           CAST(1 AS BIGINT) AS none_mode_wrote_more
    FROM orders
    GROUP BY o_orderstatus
    """,
)
def q_snapshot_write_distribution(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Iceberg's ``write.distribution-mode`` — the small-files control
    for partitioned writes, DuckDB-oracled: the SAME 8-task input
    commits into two tables partitioned by o_orderstatus, one with
    ``write_distribution='none'`` (every task emits a file per status
    it holds — at least 8 files, the small-file explosion pattern) and
    one with ``'hash'`` (a pre-write shuffle co-locates each status on
    one task — EXACTLY one file per status). The read back from the
    hash table must equal the oracle over all of orders (distribution
    changes layout, never content), and the two layout claims ride
    along as oracled constants.

    100 TB shape: mode 'none' on a 1000-task streaming write into a
    1000-partition table can emit 10^6 files PER COMMIT — the
    metadata-death pattern; 'hash' pays ONE shuffle to write exactly
    |partitions| files, and 'range' additionally clusters rows so the
    footer [min, max] stats start disjoint (the sorted-compaction
    layout at write time, no rewrite needed). This is why Iceberg
    defaults distribution-mode to hash for partitioned tables.
    """
    from ...tables import scratch_dir

    path = scratch_dir(spark, sf_dir, "snap_write_dist")
    o = (
        load_table(spark, sf_dir, "orders")
        .select("o_orderkey", "o_orderstatus", "o_totalprice")
        .repartition(8)
    )
    none_t = SnapshotTable(
        os.path.join(path, "none"),
        partition_by=["o_orderstatus"],
        write_distribution="none",
    )
    none_t.append(o)
    hash_t = SnapshotTable(
        os.path.join(path, "hash"),
        partition_by=["o_orderstatus"],
        write_distribution="hash",
    )
    hash_t.append(o)
    n_status = (
        o.select("o_orderstatus").distinct().count()
    )  # one scalar
    none_files = len(none_t._manifest(none_t._latest_published()))
    hash_files = len(hash_t._manifest(hash_t._latest_published()))
    scalars = tiny_df(spark, 
        [
            (
                int(hash_files == n_status),
                int(none_files > hash_files),
            )
        ],
        "one_file_per_partition long, none_mode_wrote_more long",
    )
    return (
        hash_t.read(spark)
        .groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(
                F.round(F.col("o_totalprice") * 100).cast("bigint")
            )
            .cast("bigint")
            .alias("cents"),
        )
        .crossJoin(F.broadcast(scalars))
    )


@query(
    "q_snapshot_row_lineage",
    oracle="""
    WITH b1 AS (
        SELECT o_orderkey,
               1099511627776 + ROW_NUMBER() OVER (ORDER BY o_orderkey)
                   - 1 AS rid
        FROM orders WHERE o_orderkey % 2 = 0
    ), b2 AS (
        SELECT o_orderkey,
               2199023255552 + ROW_NUMBER() OVER (ORDER BY o_orderkey)
                   - 1 AS rid
        FROM orders WHERE o_orderkey % 2 = 1
    ), ids AS (
        SELECT * FROM b1 UNION ALL SELECT * FROM b2
    )
    SELECT CAST(o_orderkey % 7 = 3 AS BIGINT) AS updated,
           COUNT(*) AS n_rows,
           CAST(SUM(rid) AS BIGINT) AS id_checksum,
           CAST(CASE WHEN o_orderkey % 7 = 3 THEN 3 ELSE 1 END
                AS BIGINT) AS min_seq,
           CAST(CASE WHEN o_orderkey % 7 = 3 THEN 3 ELSE 2 END
                AS BIGINT) AS max_seq
    FROM ids
    GROUP BY 1, 4, 5
    """,
)
def q_snapshot_row_lineage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Iceberg v3 ROW LINEAGE, DuckDB-oracled end-to-end: two sorted
    single-file appends mint deterministic row ids (seq * 2^40 +
    position — the oracle recomputes them with ROW_NUMBER), a
    copy-on-write UPDATE bumps ``_last_updated_seq`` to its own commit
    sequence for EXACTLY the matched rows while every identity
    survives the rewrite, and a full compaction then moves every row
    into one file — after which the id checksum and per-group
    min/max sequences must still equal the oracle's reconstruction,
    proving the materialization carried both lineage columns through
    two physical rewrites byte-exactly.

    100 TB shape: lineage is metadata + row expressions — untouched
    files pay a per-scan projection (seq literal + row position),
    rewritten files pay two extra int64 columns; no global id
    authority, no shuffle, no id-assignment coordination between
    concurrent writers (the commit sequence IS the namespace).
    """
    from ...tables import scratch_dir

    path = scratch_dir(spark, sf_dir, "snap_row_lineage")
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice"
    )
    k = F.col("o_orderkey")
    tbl = SnapshotTable(path, row_lineage=True)
    tbl.append(
        o.filter(k % 2 == 0)
        .repartition(1)
        .sortWithinPartitions("o_orderkey")
    )
    tbl.append(
        o.filter(k % 2 == 1)
        .repartition(1)
        .sortWithinPartitions("o_orderkey")
    )
    tbl.update_where(
        spark, "o_orderkey % 7 = 3", {"o_totalprice": "o_totalprice + 1"}
    )
    tbl.compact(spark)
    return (
        tbl.read(spark, lineage=True)
        .groupBy(
            (k % 7 == 3).cast("long").alias("updated"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum("_row_id").cast("bigint").alias("id_checksum"),
            F.min("_last_updated_seq").cast("bigint").alias("min_seq"),
            F.max("_last_updated_seq").cast("bigint").alias("max_seq"),
        )
    )


@query(
    "q_snapshot_check_constraint",
    oracle="""
    SELECT o_orderstatus,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
               AS cents,
           CAST(1 AS BIGINT) AS refused_batches
    FROM orders
    GROUP BY o_orderstatus
    """,
)
def q_snapshot_check_constraint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Write-time CHECK constraints, DuckDB-oracled end-to-end: a table
    declaring ``o_totalprice > 0`` takes a clean half of orders, REFUSES a
    batch with planted negative prices (the violating write dies in
    staging — the head never moves, proven by the final content), then
    takes the clean second half. The final aggregate must equal the
    oracle over ALL of orders — i.e. the refusal dropped the whole dirty
    batch and nothing else — with the refusal count riding as a constant.

    This is Delta's table-constraint model on the snapshot commit (the
    quality gate q_quality_constraints runs as a QUERY, enforced at the
    WRITE): the guard folds into the write projection as a row-local
    raise_error — one pass, whole-stage codegen, no validation scan —
    so at 100 TB it costs an expression per row, not a job.
    """
    from ...tables import scratch_dir

    path = scratch_dir(spark, sf_dir, "snap_check_constraint")
    o = load_table(spark, sf_dir, "orders")
    tbl = SnapshotTable(path, constraints={"positive_price": "o_totalprice > 0"})
    tbl.append(o.filter(F.col("o_orderkey") % 2 == 0))
    dirty = o.filter(F.col("o_orderkey") % 2 == 1).withColumn(
        "o_totalprice",
        F.when(
            F.col("o_orderkey") % 7 == 0, -F.col("o_totalprice")
        ).otherwise(F.col("o_totalprice")),
    )
    refused = 0
    try:
        tbl.append(dirty)
    except Exception:
        refused = 1
    tbl.append(o.filter(F.col("o_orderkey") % 2 == 1))
    return (
        tbl.read(spark)
        .groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(
                F.round(F.col("o_totalprice") * 100).cast("bigint")
            ).alias("cents"),
        )
        .withColumn("refused_batches", F.lit(refused).cast("bigint"))
    )


@query(
    "q_snapshot_forget",
    oracle="""
    WITH kept AS (
        SELECT * FROM orders WHERE o_orderkey % 10 <> 7
    )
    SELECT o_orderstatus,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
               AS cents,
           (SELECT COUNT(*) FROM orders WHERE o_orderkey % 10 = 7)
               AS n_forgotten,
           CAST(0 AS BIGINT) AS residual,
           CAST(1 AS BIGINT) AS n_snapshots
    FROM kept
    GROUP BY o_orderstatus
    """,
)
def q_snapshot_forget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GDPR erasure, DuckDB-oracled end-to-end: orders land in three
    snapshots, one key slice is FORGOTTEN (compact-if-MoR -> CoW delete
    -> history expire -> raw-byte verification), and the result carries
    the erasure report as oracled constants — matched count, zero
    residual matches in surviving bytes, and the single surviving
    snapshot (time travel to the pre-erasure world destroyed BY DESIGN).
    The final aggregate must equal the oracle over orders-minus-slice.

    This is the operation privacy law demands of a lakehouse and the
    one the reference's append-only usage can never express: deletion
    that is provable at the BYTE level, not visibility masking.
    """
    from ...tables import scratch_dir

    path = scratch_dir(spark, sf_dir, "snap_forget")
    o = load_table(spark, sf_dir, "orders")
    tbl = SnapshotTable(path)
    for r in range(3):
        tbl.append(o.filter(F.col("o_orderkey") % 3 == r))
    rep = tbl.forget(spark, "o_orderkey % 10 = 7")
    return (
        tbl.read(spark)
        .groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(
                F.round(F.col("o_totalprice") * 100).cast("bigint")
            ).alias("cents"),
        )
        .withColumn(
            "n_forgotten", F.lit(rep["matched"]).cast("bigint")
        )
        .withColumn(
            "residual", F.lit(rep["residual_matches"]).cast("bigint")
        )
        .withColumn(
            "n_snapshots", F.lit(len(tbl.snapshots())).cast("bigint")
        )
    )
