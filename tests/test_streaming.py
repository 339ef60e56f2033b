"""Stream-smoke tier (SURVEY.md §5.2): checkpointed ingest idempotence
(exactly-once — the upgrade over the reference's delete-before-commit,
App.java:205-207), watermarked window aggregation, stateful dedup."""

from __future__ import annotations

import json
import os
import shutil

import pytest

from iceberg_insert_spark.sources.json_ingest import (
    EVENTS_JSON_SCHEMA,
    write_fixture,
)
from iceberg_insert_spark.streaming.file_stream import (
    dedup_stream_available_now,
    ingest_available_now,
    stateful_running_totals_available_now,
    windowed_counts_available_now,
)

BASE = "/tmp/iceberg_insert_spark/stream_tests"


@pytest.fixture()
def workdir():
    if os.path.exists(BASE):
        shutil.rmtree(BASE)
    os.makedirs(BASE)
    yield BASE


def test_ingest_exactly_once_rerun(spark, workdir):
    """Re-running the drained stream must not duplicate rows; new files are
    picked up incrementally."""
    fixture = write_fixture(f"{workdir}/landing", n_rows=100)
    src = f"{fixture}/events/*/"
    dest, ckpt = f"{workdir}/out", f"{workdir}/ckpt"

    ingest_available_now(spark, src, EVENTS_JSON_SCHEMA, dest, ckpt)
    n1 = spark.read.parquet(dest).count()
    assert n1 == 98  # 100 rows - 2 malformed dropped

    # crash-replay: run again with the same checkpoint -> no duplicates
    ingest_available_now(spark, src, EVENTS_JSON_SCHEMA, dest, ckpt)
    assert spark.read.parquet(dest).count() == n1

    # late-arriving file -> only the delta is ingested
    late = {"event_id": 10_000, "component_id": "compA",
            "event_date": "2024-03-01", "event_time": "01:02:03",
            "event_ts": "2024-03-01T01:02:03", "amount": "1.23",
            "score": 1.0, "ratio": 0.5, "count": 1, "active": True,
            "geo": {"lat": 1.0, "lon": 2.0}, "tags": ["t"],
            "attrs": {"k1": "v"}}
    with open(f"{fixture}/events/compA/late.json", "w") as f:
        f.write(json.dumps(late) + "\n")
    ingest_available_now(spark, src, EVENTS_JSON_SCHEMA, dest, ckpt)
    assert spark.read.parquet(dest).count() == n1 + 1


def test_windowed_counts_with_watermark(spark, workdir):
    fixture = write_fixture(f"{workdir}/landing", n_rows=100)
    out = windowed_counts_available_now(
        spark,
        f"{fixture}/events/*/",
        EVENTS_JSON_SCHEMA,
        f"{workdir}/ckpt_win",
        query_name="t_win_counts",
    )
    rows = out.collect()
    assert sum(r.n_events for r in rows) == 98
    assert all(r.n_events > 0 for r in rows)


def test_stateful_dedup(spark, workdir):
    """Duplicate event_ids across two landing files collapse to one row."""
    fixture = write_fixture(f"{workdir}/landing", n_rows=60)
    # duplicate compA's file wholesale into a new landing file
    src_file = f"{fixture}/events/compA/batch0.json"
    shutil.copy(src_file, f"{fixture}/events/compA/batch0_dup.json")
    dest, ckpt = f"{workdir}/dedup_out", f"{workdir}/dedup_ckpt"
    dedup_stream_available_now(
        spark,
        f"{fixture}/events/*/",
        EVENTS_JSON_SCHEMA,
        dest,
        ckpt,
        key_cols=["event_id"],
    )
    back = spark.read.parquet(dest)
    assert back.count() == back.select("event_id").distinct().count()


def test_stateful_running_totals(spark, workdir):
    """applyInPandasWithState per-key running totals: the last emitted row
    per key must equal the batch groupBy over the same files."""
    from pyspark.sql import functions as F

    fixture = write_fixture(f"{workdir}/landing", n_rows=100)
    src = f"{fixture}/events/*/"
    out = stateful_running_totals_available_now(
        spark,
        src,
        EVENTS_JSON_SCHEMA,
        f"{workdir}/state_ckpt",
        query_name="t_state_totals",
    )
    # "update" mode emits one running row per key per batch; the final row
    # (max n_events) per key is the completed total.
    final = {}
    for r in out.collect():
        if r.component_id not in final or r.n_events > final[r.component_id][0]:
            final[r.component_id] = (r.n_events, r.sum_value)
    batch = (
        spark.read.schema(EVENTS_JSON_SCHEMA)
        .option("mode", "DROPMALFORMED")
        .json(src)
        .groupBy("component_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.coalesce("score", F.lit(0.0))).alias("s"),
        )
    )
    expected = {r.component_id: (r.n, r.s) for r in batch.collect()}
    assert set(final) == set(expected)
    for k, (n, s) in expected.items():
        assert final[k][0] == n, (k, final[k], n)
        assert abs(final[k][1] - s) < 1e-6, (k, final[k], s)


def test_stream_stream_interval_join(spark, workdir):
    """Stream-stream watermarked interval join == the batch join over the
    same files."""
    from pyspark.sql import functions as F

    from iceberg_insert_spark.streaming.file_stream import (
        stream_stream_join_available_now,
    )

    fixture = write_fixture(f"{workdir}/landing", n_rows=80)
    src = f"{fixture}/events/*/"
    # fixture ts spacing: same-component events are >= 4h apart, so the
    # interval must be hours-wide to produce pairs
    out = stream_stream_join_available_now(
        spark, src, EVENTS_JSON_SCHEMA, f"{workdir}/ssj_ckpt",
        window="4 hours",
        query_name="t_ssj",
    )
    got = {tuple(r) for r in out.select("l_id", "r_id").collect()}
    ev = (
        spark.read.schema(EVENTS_JSON_SCHEMA)
        .option("mode", "DROPMALFORMED")
        .json(src)
        .withColumn("event_ts", F.col("event_ts").cast("timestamp"))
        .select("event_id", "component_id", "event_ts")
    )
    l = ev.select(
        F.col("event_id").alias("l_id"),
        F.col("component_id").alias("l_key"),
        F.col("event_ts").alias("l_ts"),
    )
    r = ev.select(
        F.col("event_id").alias("r_id"),
        F.col("component_id").alias("r_key"),
        F.col("event_ts").alias("r_ts"),
    )
    expect = {
        tuple(x)
        for x in l.join(
            r,
            F.expr(
                "l_key = r_key AND r_ts < l_ts "
                "AND r_ts >= l_ts - INTERVAL 4 HOURS"
            ),
        ).select("l_id", "r_id").collect()
    }
    assert got == expect
    assert len(got) > 0


def test_quarantine_read_catches_malformed(spark, workdir):
    """PERMISSIVE quarantine: clean + corrupt partitions the input; nothing
    silently vanishes (upgrade over the reference's catch->null drop)."""
    from iceberg_insert_spark.sources.json_ingest import (
        read_events_json_quarantine,
    )

    fixture = write_fixture(f"{workdir}/landing", n_rows=100)
    clean, quarantine = read_events_json_quarantine(spark, fixture)
    assert clean.count() == 98
    assert quarantine.count() == 2  # the ~2% malformed lines
    assert all("broken" in r.raw_line for r in quarantine.collect())


def test_continuous_daily_rollup(spark, workdir):
    """foreachBatch-maintained rollup == batch groupBy over all files, and
    is idempotent across a checkpointed re-run."""
    from pyspark.sql import functions as F

    from iceberg_insert_spark.streaming.file_stream import (
        continuous_daily_rollup_available_now,
    )

    fixture = write_fixture(f"{workdir}/landing", n_rows=100)
    src = f"{fixture}/events/*/"
    rollup_dir, ckpt = f"{workdir}/rollup", f"{workdir}/rollup_ckpt"
    out = continuous_daily_rollup_available_now(
        spark, src, EVENTS_JSON_SCHEMA, rollup_dir, ckpt
    )
    batch = (
        spark.read.schema(EVENTS_JSON_SCHEMA)
        .option("mode", "DROPMALFORMED")
        .json(src)
        .groupBy("event_date")
        .agg(F.count(F.lit(1)).alias("n_events"))
    )
    expect = sorted(map(tuple, batch.collect()))
    assert sorted(map(tuple, out.collect())) == expect
    # re-run with same checkpoint: no new batches -> rollup unchanged
    out2 = continuous_daily_rollup_available_now(
        spark, src, EVENTS_JSON_SCHEMA, rollup_dir, ckpt
    )
    assert sorted(map(tuple, out2.collect())) == expect


def test_rollup_compaction_preserves_totals(spark, workdir):
    """compact_rollup folds every batch_id=N delta into the batch_id=-1
    base, keeps the aggregated totals bit-identical, is a no-op when
    re-run, and new post-compaction deltas still aggregate correctly."""
    import os

    from pyspark.sql import functions as F

    from iceberg_insert_spark.streaming.file_stream import (
        compact_rollup,
        continuous_daily_rollup_available_now,
    )

    fixture = write_fixture(f"{workdir}/landing", n_rows=100)
    src = f"{fixture}/events/*/"
    rollup_dir, ckpt = f"{workdir}/rollup", f"{workdir}/rollup_ckpt"
    out = continuous_daily_rollup_available_now(
        spark, src, EVENTS_JSON_SCHEMA, rollup_dir, ckpt
    )
    expect = sorted(map(tuple, out.collect()))

    folded = compact_rollup(spark, rollup_dir)
    assert folded >= 1
    parts = [p for p in os.listdir(rollup_dir) if p.startswith("batch_id=")]
    assert parts == ["batch_id=-1"]
    compacted = (
        spark.read.parquet(rollup_dir)
        .groupBy("event_date")
        .agg(F.sum("n_events").alias("n_events"))
    )
    assert sorted(map(tuple, compacted.collect())) == expect
    assert compact_rollup(spark, rollup_dir) == 0  # idempotent no-op

    # new deltas after compaction land beside the base and aggregate in
    fixture2 = write_fixture(f"{workdir}/landing2", n_rows=40)
    out3 = continuous_daily_rollup_available_now(
        spark, f"{fixture2}/events/*/", EVENTS_JSON_SCHEMA, rollup_dir, ckpt
    )
    total_expect = sum(n for _, n in expect) + 40
    assert sum(n for _, n in out3.collect()) == total_expect


def test_stream_static_enrichment(spark, workdir):
    """Stream-static broadcast join: every surviving event is decorated with
    its dimension row, matching the equivalent BATCH join exactly; events
    with no dimension row are dropped (inner semantics)."""
    from iceberg_insert_spark.streaming.file_stream import (
        stream_static_enrich_available_now,
    )

    fixture = write_fixture(f"{workdir}/landing", n_rows=100)
    src = f"{fixture}/events/*/"
    dim_path = f"{workdir}/dim"
    # dimension covers compA only -> compB events must drop out
    spark.createDataFrame(
        [("compA", "alice", "gold")], "component_id string, owner string, tier string"
    ).write.mode("overwrite").parquet(dim_path)

    got = stream_static_enrich_available_now(
        spark, src, EVENTS_JSON_SCHEMA, dim_path, f"{workdir}/ckpt",
        query_name="enrich_t1",
    )
    batch = (
        spark.read.schema(EVENTS_JSON_SCHEMA)
        .option("mode", "DROPMALFORMED")
        .json(src)
        .join(spark.read.parquet(dim_path), "component_id")
        .select("event_id", "component_id", "owner", "tier", "score")
    )
    g = sorted(map(tuple, got.collect()))
    b = sorted(map(tuple, batch.collect()))
    assert g == b
    assert len(g) > 0
    assert {r[1] for r in g} == {"compA"}
    assert {r[2] for r in g} == {"alice"}


def test_incremental_dedup_stream(spark, workdir):
    """Streaming signature-store dedup: per-file micro-batches classify
    against the store built by earlier batches, and a later run (new file,
    same checkpoint) sees the persisted store."""
    import json
    import os

    from iceberg_insert_spark.streaming.file_stream import (
        incremental_dedup_stream_available_now,
    )

    from pyspark.sql.types import LongType, StringType, StructField, StructType

    land = f"{workdir}/docs_landing"
    os.makedirs(land, exist_ok=True)
    texts = {i: f"alpha{i} beta{i} gamma{i} delta{i}" for i in range(10)}
    # batch 0: ten unique docs
    with open(f"{land}/b0.json", "w") as f:
        for i in range(10):
            f.write(json.dumps({"doc_id": i, "text": texts[i]}) + "\n")
    run = lambda: incremental_dedup_stream_available_now(  # noqa: E731
        spark,
        land,
        StructType(
            [
                StructField("doc_id", LongType()),
                StructField("text", StringType()),
            ]
        ),
        f"{workdir}/sig_store",
        f"{workdir}/dedup_out",
        f"{workdir}/dedup_stream_ckpt",
    )
    out = {r.doc_id: r for r in run().collect()}
    assert all(out[i].status == "new" for i in range(10))

    # batch 1 (new landing file, same checkpoint): 2 corpus dups (reordered
    # tokens — the fingerprint is order-insensitive), an in-batch dup pair,
    # and one new doc
    with open(f"{land}/b1.json", "w") as f:
        f.write(json.dumps({"doc_id": 10, "text": texts[0]}) + "\n")
        reordered = " ".join(reversed(texts[1].split()))
        f.write(json.dumps({"doc_id": 11, "text": reordered}) + "\n")
        f.write(json.dumps({"doc_id": 12, "text": "fresh one two"}) + "\n")
        f.write(json.dumps({"doc_id": 13, "text": "fresh one two"}) + "\n")
        f.write(json.dumps({"doc_id": 14, "text": "lone new doc"}) + "\n")
    out = {r.doc_id: r for r in run().collect()}
    assert len(out) == 15
    assert (out[10].status, out[10].keep_id) == ("dup_corpus", 0)
    assert (out[11].status, out[11].keep_id) == ("dup_corpus", 1)
    assert (out[12].status, out[12].keep_id) == ("new", 12)
    assert (out[13].status, out[13].keep_id) == ("dup_batch", 12)
    assert (out[14].status) == "new"

    # store holds exactly one row per distinct fingerprint, never a dup fp
    store = spark.read.parquet(f"{workdir}/sig_store")
    assert store.count() == store.select("fp").distinct().count() == 12


def test_observed_ingest_metrics(spark, workdir):
    """observe() metrics must equal a batch aggregate over the same files,
    with no second scan issued by the stream."""
    fixture = write_fixture(f"{workdir}/landing", n_rows=80)
    src = f"{fixture}/events/*/"
    dest = f"{workdir}/obs_out"
    from iceberg_insert_spark.streaming.file_stream import (
        observed_ingest_available_now,
    )

    metrics = observed_ingest_available_now(
        spark, src, EVENTS_JSON_SCHEMA, dest, f"{workdir}/obs_ckpt"
    )
    assert metrics, "no observed metrics surfaced"
    total = sum(m["n_rows"] for m in metrics)
    from pyspark.sql import functions as F

    batch = (
        spark.read.schema(EVENTS_JSON_SCHEMA)
        .option("mode", "DROPMALFORMED")
        .json(src)
    )
    assert total == batch.count()
    got_sum = sum(m["sum_score"] for m in metrics)
    want_sum = batch.agg(
        F.sum(F.coalesce("score", F.lit(0.0)))
    ).first()[0]
    assert abs(got_sum - want_sum) < 1e-6
    # and the sink actually landed every row
    assert spark.read.parquet(dest).count() == total


def test_streaming_session_windows(spark, workdir):
    """Streaming session windows must agree with the batch session_window
    aggregate over the same files (emitted sessions are those the final
    watermark closed — a subset in append mode; each must match its batch
    twin row exactly)."""
    from pyspark.sql import functions as F

    from iceberg_insert_spark.streaming.file_stream import (
        session_windows_available_now,
    )

    fixture = write_fixture(f"{workdir}/landing", n_rows=90)
    src = f"{fixture}/events/*/"
    out = session_windows_available_now(
        spark, src, EVENTS_JSON_SCHEMA, f"{workdir}/sess_ckpt",
        query_name="t_sessions",
    )
    emitted = {
        (r.component_id, r.session_start, r.session_end):
            (r.n_events, round(r.sum_score, 6))
        for r in out.collect()
    }
    assert emitted, "no sessions closed by the final watermark"
    batch = (
        spark.read.schema(EVENTS_JSON_SCHEMA)
        .option("mode", "DROPMALFORMED")
        .json(src)
        .groupBy("component_id", F.session_window("event_ts", "30 minutes"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.coalesce("score", F.lit(0.0))).alias("sum_score"),
        )
    )
    want = {
        (r.component_id, r["session_window"].start, r["session_window"].end):
            (r.n_events, round(r.sum_score, 6))
        for r in batch.collect()
    }
    for k, v in emitted.items():
        assert want.get(k) == v, (k, v, want.get(k))


def test_snapshot_table_as_streaming_source(spark, tmp_path_factory):
    """SnapshotTable as a streaming source: one micro-batch per new
    snapshot from a durable checkpoint — restart resumes with no
    re-delivery; a crash between process and checkpoint replays the
    batch, and the downstream append_once token makes the replay a
    no-op (exactly-once end to end); non-append snapshots are skipped
    only on request; merge commits always refuse."""
    from pyspark.sql import functions as F

    from iceberg_insert_spark.sources.snapshots import SnapshotTable
    from iceberg_insert_spark.streaming.file_stream import (
        snapshot_stream_available_now,
    )

    base = tmp_path_factory.mktemp("snapstream")
    src = SnapshotTable(str(base / "src"))
    sink = SnapshotTable(str(base / "sink"))
    ckpt = str(base / "ckpt.json")
    seen: list[tuple[int, int]] = []

    def process(batch, v):
        seen.append((v, batch.count()))
        sink.append_once(batch, token=f"snap-{v}")

    def rows(lo, hi):
        return spark.range(lo, hi).withColumnRenamed("id", "k")

    src.append(rows(0, 10))
    src.append(rows(10, 15))
    got = snapshot_stream_available_now(spark, src, ckpt, process)
    assert got == [1, 2]
    assert seen == [(1, 10), (2, 5)]
    assert sink.read(spark).count() == 15
    # restart with nothing new: no batches, no re-delivery
    assert snapshot_stream_available_now(spark, src, ckpt, process) == []
    assert seen == [(1, 10), (2, 5)]
    # new commits resume from the checkpoint
    src.append(rows(15, 18))
    assert snapshot_stream_available_now(spark, src, ckpt, process) == [3]
    assert sink.read(spark).count() == 18
    # crash between process and checkpoint: rewind the checkpoint to
    # simulate; the batch is REDELIVERED (at-least-once) but the sink's
    # token dedup keeps it exactly-once
    with open(ckpt, "w") as fh:
        json.dump({"last_snapshot": 2}, fh)
    assert snapshot_stream_available_now(spark, src, ckpt, process) == [3]
    assert seen[-2:] == [(3, 3), (3, 3)]  # delivered twice...
    assert sink.read(spark).count() == 18  # ...committed once
    # non-append snapshots: clean error by default, skipped on request
    src.overwrite(rows(0, 4))
    with pytest.raises(ValueError, match="overwrite"):
        snapshot_stream_available_now(spark, src, ckpt, process)
    assert snapshot_stream_available_now(
        spark, src, ckpt, process, skip_non_append=True
    ) == []
    # appends after the skipped overwrite flow again
    src.append(rows(100, 102))
    assert snapshot_stream_available_now(spark, src, ckpt, process) == [5]
    # merge commits always refuse: the delta is a changelog
    chg = spark.createDataFrame([(0, "D")], "k long, _op string")
    src.merge(spark, chg, key="k")
    with pytest.raises(ValueError, match="changelog"):
        snapshot_stream_available_now(spark, src, ckpt, process)


def test_changelog_stream_replica_crash_and_cow(spark, tmp_path):
    """CDC streaming read: a replica applying every changelog batch
    (deletes before inserts) must converge to the source state; a crash
    mid-stream redelivers the unacknowledged batch (at-least-once); a
    CoW delete commit refuses by default and skips under skip_replace."""
    import pytest

    from iceberg_insert_spark.sources.snapshots import SnapshotTable
    from iceberg_insert_spark.streaming.file_stream import (
        changelog_stream_available_now,
    )

    def mk(rows):
        return spark.createDataFrame(rows, "k long, v string")

    tbl = SnapshotTable(str(tmp_path / "t"))
    tbl.append(mk([(1, "a"), (2, "b"), (3, "c")]))
    ch = spark.createDataFrame(
        [(2, "b2", "U"), (3, None, "D"), (4, "d", "I")],
        "k long, v string, _op string",
    )
    tbl.merge(spark, ch, key="k")
    tbl.append(mk([(5, "e")]))

    replica: dict = {}

    def apply(batch, v):
        rows = batch.collect()
        for r in rows:
            if r["_change_type"] == "delete":
                replica.pop(r.k, None)
        for r in rows:
            if r["_change_type"] == "insert":
                replica[r.k] = r.v

    ckpt = str(tmp_path / "ckpt")
    done = changelog_stream_available_now(spark, tbl, ckpt, apply)
    assert done == [1, 2, 3]
    src = {r.k: r.v for r in tbl.read(spark).collect()}
    assert replica == src == {1: "a", 2: "b2", 4: "d", 5: "e"}

    # crash mid-stream: batch 2's failure must NOT advance past batch 1
    tbl2 = SnapshotTable(str(tmp_path / "t2"))
    tbl2.append(mk([(1, "a")]))
    tbl2.append(mk([(2, "b")]))
    seen: list[int] = []

    def crashy(batch, v):
        if v == 2:
            raise RuntimeError("sink crashed")
        seen.append(v)

    ck2 = str(tmp_path / "ck2")
    with pytest.raises(RuntimeError):
        changelog_stream_available_now(spark, tbl2, ck2, crashy)
    assert seen == [1]
    got: list[int] = []
    changelog_stream_available_now(
        spark, tbl2, ck2, lambda b, v: got.append((v, b.count()))
    )
    assert got == [(2, 1)]  # batch 2 redelivered exactly once, batch 1 not

    # CoW delete: refuse by default; skip with skip_replace reports
    # the skipped commit through on_skip so the consumer KNOWS
    tbl2.delete_where(spark, "k = 1")
    tbl2.append(mk([(9, "z")]))
    with pytest.raises(ValueError, match="delete"):
        changelog_stream_available_now(
            spark, tbl2, ck2, lambda b, v: None
        )
    after: list[int] = []
    skipped: list[tuple] = []
    changelog_stream_available_now(
        spark, tbl2, ck2,
        lambda b, v: after.append(v), skip_replace=True,
        on_skip=lambda v, op: skipped.append((v, op)),
    )
    assert after == [4]  # the post-delete append, relative to post-CoW state
    assert skipped == [(3, "delete")]  # the re-sync signal


def test_changelog_stream_bootstrap_and_expired_checkpoint(
    spark, tmp_path
):
    """A fresh subscriber on a MAINTAINED table (oldest survivor is a
    compaction) bootstraps from its full state; an existing consumer
    whose checkpointed snapshot was expired gets a rebuild-required
    error, never a silent re-bootstrap."""
    import pytest

    from iceberg_insert_spark.sources.snapshots import SnapshotTable
    from iceberg_insert_spark.streaming.file_stream import (
        changelog_stream_available_now,
    )

    def mk(rows):
        return spark.createDataFrame(rows, "k long, v string")

    tbl = SnapshotTable(str(tmp_path / "t"))
    tbl.append(mk([(1, "a")]))
    ck_old = str(tmp_path / "ck_old")
    changelog_stream_available_now(
        spark, tbl, ck_old, lambda b, v: None
    )  # existing consumer checkpointed at snapshot 1
    tbl.append(mk([(2, "b")]))
    v3 = tbl.compact(spark)  # replace commit
    tbl.expire(keep_from=v3)  # snapshots 1-2 gone; survivor is the compact
    tbl.append(mk([(3, "c")]))

    # fresh subscriber: full-insert bootstrap from the compact state
    got: list[tuple] = []
    changelog_stream_available_now(
        spark, tbl, str(tmp_path / "ck_new"),
        lambda b, v: got.append((v, b.count())),
    )
    assert got == [(v3, 2), (v3 + 1, 1)]

    # expired checkpoint: clean rebuild-required error
    with pytest.raises(ValueError, match="rebuild"):
        changelog_stream_available_now(
            spark, tbl, ck_old, lambda b, v: None
        )


def test_snapshot_stream_rate_limited_splits_and_resumes(
    spark, tmp_path_factory
):
    """max_files_per_batch (Iceberg's max-files-per-micro-batch): a
    commit that added many files splits into capped sub-batches; a crash
    mid-snapshot resumes at the failed chunk without re-delivering
    completed ones; downstream exactly-once uses (snapshot, offset)
    tokens; full drain equals the table."""
    from pyspark.sql import functions as F

    from iceberg_insert_spark.sources.snapshots import SnapshotTable
    from iceberg_insert_spark.streaming.file_stream import (
        snapshot_stream_available_now,
    )

    base = tmp_path_factory.mktemp("ratelimit")
    src = SnapshotTable(str(base / "src"))
    sink = SnapshotTable(str(base / "sink"))
    ckpt = str(base / "ckpt.json")

    # one commit, 6 data files; a second small commit after it
    src.append(spark.range(0, 60).withColumnRenamed("id", "k").repartition(6))
    src.append(spark.range(60, 70).withColumnRenamed("id", "k").coalesce(1))
    n_files_v1 = len(src._manifest(1))
    assert n_files_v1 == 6

    seen: list[tuple[int, int, int]] = []
    boom = {"at": 4}  # crash before the chunk starting at file index 4

    def process(batch, v, off):
        if v == 1 and off == boom["at"]:
            raise RuntimeError("consumer crash")
        seen.append((v, off, batch.count()))
        sink.append_once(batch, token=f"snap-{v}-{off}")

    with pytest.raises(RuntimeError, match="consumer crash"):
        snapshot_stream_available_now(
            spark, src, ckpt, process, max_files_per_batch=2
        )
    # chunks [0,2) and [2,4) landed; crash at [4,6)
    assert [(v, o) for v, o, _ in seen] == [(1, 0), (1, 2)]

    boom["at"] = -1  # recover
    got = snapshot_stream_available_now(
        spark, src, ckpt, process, max_files_per_batch=2
    )
    assert got == [1, 2]
    # resume started at chunk 4 — chunks 0 and 2 were NOT re-delivered
    assert [(v, o) for v, o, _ in seen] == [(1, 0), (1, 2), (1, 4), (2, 0)]
    assert sink.read(spark).count() == 70
    assert {r.k for r in sink.read(spark).collect()} == set(range(70))
    # drained: nothing more, and the sub-snapshot cursor is cleared
    assert (
        snapshot_stream_available_now(
            spark, src, ckpt, process, max_files_per_batch=2
        )
        == []
    )
    import json

    with open(ckpt) as fh:
        ck = json.load(fh)
    assert ck == {"last_snapshot": 2}
    with pytest.raises(ValueError, match=">= 1"):
        snapshot_stream_available_now(
            spark, src, ckpt, process, max_files_per_batch=0
        )


def test_snapshot_stream_rate_limit_no_rewind_and_mode_guard(
    spark, tmp_path_factory
):
    """Review regressions: (a) a mid-snapshot sub-batch checkpoint must
    NOT rewind last_snapshot past snapshots completed earlier in the
    SAME run (restart would re-deliver them); (b) resuming over a
    pending sub-snapshot cursor WITHOUT max_files_per_batch refuses —
    the full-batch snap-{v} token would re-deliver already-sunk
    chunks under a new identity."""
    from iceberg_insert_spark.sources.snapshots import SnapshotTable
    from iceberg_insert_spark.streaming.file_stream import (
        snapshot_stream_available_now,
    )

    base = tmp_path_factory.mktemp("norewind")
    src = SnapshotTable(str(base / "src"))
    ckpt = str(base / "ckpt.json")
    # snapshot 1: one file; snapshot 2: four files
    src.append(spark.range(0, 5).withColumnRenamed("id", "k").coalesce(1))
    src.append(
        spark.range(5, 45).withColumnRenamed("id", "k").repartition(4)
    )

    seen = []
    boom = {"at": (2, 2)}

    def process(batch, v, off):
        if (v, off) == boom["at"]:
            raise RuntimeError("crash")
        seen.append((v, off))

    with pytest.raises(RuntimeError):
        snapshot_stream_available_now(
            spark, src, ckpt, process, max_files_per_batch=2
        )
    assert seen == [(1, 0), (2, 0)]
    import json

    with open(ckpt) as fh:
        ck = json.load(fh)
    # snapshot 1 stays fully processed in the durable cursor
    assert ck == {"last_snapshot": 1, "next_snapshot": 2, "next_pos": 2}

    # (b) full-batch mode refuses to resume over the pending cursor
    with pytest.raises(ValueError, match="sub-snapshot cursor"):
        snapshot_stream_available_now(
            spark, src, ckpt, lambda b, v: None
        )

    boom["at"] = (-1, -1)
    got = snapshot_stream_available_now(
        spark, src, ckpt, process, max_files_per_batch=2
    )
    # snapshot 1 NOT re-delivered; snapshot 2 resumed at its failed chunk
    assert got == [2]
    assert seen == [(1, 0), (2, 0), (2, 2)]


def test_snapshot_stream_into_constrained_table(spark, tmp_path):
    """Three-subsystem composition: the snapshot STREAM tails a source
    table and sinks via append_once into a CHECK-constrained downstream
    table. A violating source snapshot fails ITS batch (downstream head
    and checkpoint both unmoved — the stream is resumable), a
    drop_constraint unblocks, and the resumed drain delivers the failed
    batch plus the rest EXACTLY ONCE (token replay proven a no-op)."""
    import pytest

    from iceberg_insert_spark.sources.snapshots import SnapshotTable
    from iceberg_insert_spark.streaming.file_stream import (
        snapshot_stream_available_now,
    )

    src = SnapshotTable(str(tmp_path / "src"))
    dst = SnapshotTable(
        str(tmp_path / "dst"), constraints={"pos": "v > 0"}
    )
    ck = str(tmp_path / "ck.json")
    src.append(spark.createDataFrame([(1, 5.0)], "k int, v double"))
    src.append(spark.createDataFrame([(2, -1.0)], "k int, v double"))
    src.append(spark.createDataFrame([(3, 7.0)], "k int, v double"))

    def sink(batch, v):
        dst.append_once(batch, token=f"snap-{v}")

    with pytest.raises(Exception, match="CHECK constraint"):
        snapshot_stream_available_now(spark, src, ck, sink)
    # batch 1 landed, the violating batch 2 did not, checkpoint stopped
    # BEFORE it — the failed snapshot re-delivers after the fix
    assert sorted(r.k for r in dst.read(spark).collect()) == [1]
    dst.drop_constraint("pos")
    done = snapshot_stream_available_now(spark, src, ck, sink)
    assert done == [2, 3]
    assert sorted(r.k for r in dst.read(spark).collect()) == [1, 2, 3]
    # replaying the whole drain is a no-op end to end (exactly-once)
    assert snapshot_stream_available_now(spark, src, ck, sink) == []
    assert dst.read(spark).count() == 3


def test_snapshot_stream_continuous_soak_with_concurrent_writer(
    spark, tmp_path
):
    """CONTINUOUS-TRIGGER soak (the posture a real tailing consumer
    runs, r6 verdict item): a writer THREAD keeps appending while a
    ProcessingTime-style trigger loop drains the table; a crash is
    injected mid-trigger at the worst-case window (AFTER the
    downstream exactly-once commit, BEFORE the checkpoint advance);
    the loop keeps firing, the redelivered batch is a proven no-op via
    its append_once token, and at the end every source row is
    downstream EXACTLY once with one token per source snapshot.
    Post-soak triggers against the drained table process nothing."""
    import threading
    import time

    from iceberg_insert_spark.sources.snapshots import SnapshotTable
    from iceberg_insert_spark.streaming.file_stream import (
        snapshot_stream_tail,
    )

    src = SnapshotTable(str(tmp_path / "src"))
    sink = SnapshotTable(str(tmp_path / "sink"))
    ckpt = str(tmp_path / "ckpt.json")

    N_COMMITS, ROWS_PER = 12, 50
    writer_err: list = []

    def writer():
        try:
            for i in range(N_COMMITS):
                src.append(
                    spark.range(
                        i * ROWS_PER, (i + 1) * ROWS_PER
                    ).withColumnRenamed("id", "k")
                )
                time.sleep(0.15)
        except Exception as ex:  # surfaced by the main thread
            writer_err.append(ex)

    crash_once = {"armed": True}
    delivered: list[int] = []

    def process(batch, v):
        # downstream exactly-once commit FIRST...
        sink.append_once(batch, token=f"snap-{v}")
        delivered.append(v)
        # ...then the injected crash: checkpoint has NOT advanced, so
        # the next trigger must redeliver v and the token must absorb it
        if v == 5 and crash_once["armed"]:
            crash_once["armed"] = False
            raise RuntimeError("injected crash after commit, before ckpt")

    t = threading.Thread(target=writer)
    t.start()
    try:
        report = snapshot_stream_tail(
            spark, src, ckpt, process, n_triggers=30, interval_s=0.12
        )
    finally:
        t.join()
    assert not writer_err, writer_err
    # drain anything the last trigger raced past — under a loaded host
    # the writer may lag the whole main loop, so the injected crash is
    # allowed to fire in EITHER loop (exactly once in total); the
    # drain loop has enough triggers to absorb the crash + redelivery
    tail = snapshot_stream_tail(
        spark, src, ckpt, process, n_triggers=4
    )
    all_errors = report["errors"] + tail["errors"]
    assert len(all_errors) == 1 and "injected" in all_errors[0][1]
    assert crash_once["armed"] is False
    # snapshot 5 was DELIVERED twice (at-least-once) ...
    assert delivered.count(5) == 2
    # ... but exactly-once downstream: every row once, no dupes
    got = sorted(r.k for r in sink.read(spark).collect())
    assert got == list(range(N_COMMITS * ROWS_PER))
    # every source snapshot processed exactly once in ledger terms:
    # one exactly-once token per snapshot, each bound to one commit
    tokens = sink._token_index()
    assert set(tokens) == {
        f"snap-{v}" for v in src.snapshots()
    }
    # replay posture: further triggers on the drained table are no-ops
    idle = snapshot_stream_tail(spark, src, ckpt, process, n_triggers=3)
    assert idle["processed"] == [] and not idle["errors"]
    assert sink.read(spark).count() == N_COMMITS * ROWS_PER
    # full union of per-trigger batches == the snapshot ids, in order
    all_ids = report["processed"] + tail["processed"]
    assert all_ids == sorted(src.snapshots())
    # checkpoint stays O(1) across the whole soak: one bounded JSON
    # cursor, never a growing offset log to compact (the structured-
    # streaming checkpoint-compaction failure mode does not exist here)
    with open(ckpt) as fh:
        ck = json.load(fh)
    assert set(ck) <= {"last_snapshot", "next_snapshot", "next_pos"}
    assert os.path.getsize(ckpt) < 1024


def test_changelog_tail_soak_replica_converges_under_writer(
    spark, tmp_path
):
    """CDC continuous-trigger soak: the SAME tail loop drives the
    changelog stream (stream_fn=changelog_stream_available_now) while
    a writer thread interleaves appends and MERGE commits; a crash is
    injected mid-trigger AFTER a batch was applied (worst-case window);
    the loop keeps firing, the redelivered changelog batch re-applies
    idempotently (delete-then-insert over a keyed replica), and the
    replica CONVERGES exactly to the source state with the full
    snapshot ledger accounted."""
    import threading
    import time

    from iceberg_insert_spark.sources.snapshots import SnapshotTable
    from iceberg_insert_spark.streaming.file_stream import (
        changelog_stream_available_now,
        snapshot_stream_tail,
    )

    src = SnapshotTable(str(tmp_path / "src"))
    src.append(
        spark.createDataFrame(
            [(i, "v0") for i in range(20)], "k long, v string"
        )
    )
    writer_err: list = []

    def writer():
        try:
            for i in range(1, 9):
                if i % 3 == 0:
                    # merge: update half the keys, delete one, insert one
                    ch = spark.createDataFrame(
                        [(kk, f"u{i}", "U") for kk in range(0, 20, 4)]
                        + [(i, None, "D"), (100 + i, f"n{i}", "I")],
                        "k long, v string, _op string",
                    )
                    src.merge(spark, ch, key="k")
                else:
                    src.append(
                        spark.createDataFrame(
                            [(200 + 10 * i + j, f"a{i}") for j in range(3)],
                            "k long, v string",
                        )
                    )
                time.sleep(0.2)
        except Exception as ex:
            writer_err.append(ex)

    replica: dict = {}
    crash = {"armed": True}

    def apply(batch, v):
        rows = batch.collect()
        for r in rows:
            if r["_change_type"] == "delete":
                replica.pop(r.k, None)
        for r in rows:
            if r["_change_type"] == "insert":
                replica[r.k] = r.v
        if v >= 4 and crash["armed"]:
            crash["armed"] = False
            raise RuntimeError("injected crash after apply")

    ckpt = str(tmp_path / "ckpt")
    t = threading.Thread(target=writer)
    t.start()
    try:
        report = snapshot_stream_tail(
            spark,
            src,
            ckpt,
            apply,
            n_triggers=25,
            interval_s=0.15,
            stream_fn=changelog_stream_available_now,
        )
    finally:
        t.join()
    assert not writer_err, writer_err
    # the crash may fire in either loop under host load (the writer
    # can lag the whole main loop): exactly once in total, and the
    # drain loop absorbs the redelivery
    tail = snapshot_stream_tail(
        spark,
        src,
        ckpt,
        apply,
        n_triggers=4,
        stream_fn=changelog_stream_available_now,
    )
    all_errors = report["errors"] + tail["errors"]
    assert len(all_errors) == 1 and "injected" in all_errors[0][1]
    assert crash["armed"] is False
    # exact convergence: replica == source, despite the redelivery
    srcmap = {r.k: r.v for r in src.read(spark).collect()}
    assert replica == srcmap
    # complete ledger: every main snapshot delivered exactly once
    all_ids = report["processed"] + tail["processed"]
    assert all_ids == sorted(src.snapshots())


def test_mirror_lifecycle_merge_heavy_with_crash(spark, tmp_path):
    """mirror_available_now (r7 verdict #8): a MERGE-heavy source —
    appends, two CDC merges (updates + deletes + re-insert of a
    deleted key), another append — mirrors into an independent target
    whose rows equal the source's after every run. Crash treatment:
    the checkpoint is REWOUND past an applied batch (the worst-case
    window — durable merge, lost checkpoint advance), and the re-run
    replays the batch into the mirror token, committing NOTHING new
    (one merge commit per source snapshot, exactly-once). A CoW
    delete on the source then refuses by default."""
    import json as _json

    import pytest

    from iceberg_insert_spark.sources.snapshots import SnapshotTable
    from iceberg_insert_spark.streaming.file_stream import (
        mirror_available_now,
    )

    def mk(rows):
        return spark.createDataFrame(rows, "k long, v string")

    def state(t):
        return {r.k: r.v for r in t.read(spark).collect()}

    src = SnapshotTable(str(tmp_path / "src"))
    src.append(mk([(1, "a"), (2, "b"), (3, "c")]))
    src.merge(
        spark,
        spark.createDataFrame(
            [(2, "b2", "U"), (3, None, "D"), (4, "d", "I")],
            "k long, v string, _op string",
        ),
        key="k",
    )
    src.append(mk([(5, "e")]))
    tgt = SnapshotTable(str(tmp_path / "tgt"))
    ckpt = str(tmp_path / "ckpt")

    done = mirror_available_now(spark, src, tgt, "k", ckpt)
    assert done == [1, 2, 3]
    assert state(tgt) == state(src) == {1: "a", 2: "b2", 4: "d", 5: "e"}
    n_tgt = len(tgt.snapshots())
    assert n_tgt == 3  # one merge commit per source snapshot

    # worst-case crash window: merge durable, checkpoint advance lost
    # — rewind the cursor one snapshot and re-run; the replayed batch
    # must be absorbed by its mirror token (no new target commit)
    with open(ckpt) as fh:
        cur = _json.load(fh)
    cur["last_snapshot"] = 2
    with open(ckpt, "w") as fh:
        _json.dump(cur, fh)
    redone = mirror_available_now(spark, src, tgt, "k", ckpt)
    assert redone == [3]
    assert len(tgt.snapshots()) == n_tgt  # token absorbed the replay
    assert state(tgt) == state(src)

    # keep mirroring: a second merge wave re-inserts a DELETED key and
    # deletes a mirrored one — the fold (delete+insert pair == upsert,
    # delete-only == D) must land it in one commit
    src.merge(
        spark,
        spark.createDataFrame(
            [(3, "c2", "I"), (5, None, "D"), (1, "a2", "U")],
            "k long, v string, _op string",
        ),
        key="k",
    )
    done2 = mirror_available_now(spark, src, tgt, "k", ckpt)
    assert done2 == [4]
    assert state(tgt) == state(src) == {1: "a2", 2: "b2", 3: "c2", 4: "d"}
    assert len(tgt.snapshots()) == n_tgt + 1

    # replace-type source commit: refuse by default (silent divergence
    # is the failure mode), deliverable only via skip_replace
    src.delete_where(spark, "k = 4")  # CoW rewrite
    with pytest.raises(ValueError, match="not derivable"):
        mirror_available_now(spark, src, tgt, "k", ckpt)
    skipped: list = []
    mirror_available_now(
        spark, src, tgt, "k", ckpt,
        skip_replace=True, on_skip=lambda v, op: skipped.append((v, op)),
    )
    assert skipped == [(5, "delete")]
