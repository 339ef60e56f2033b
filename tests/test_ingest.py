"""Unit tier: JSON type-coercion matrix mirroring the reference parser
(App.java:241-319) — clean rows, missing fields -> null, extra fields ->
ignored, malformed lines -> dropped (DROPMALFORMED)."""

from __future__ import annotations

import datetime as dt
from decimal import Decimal

from pyspark.sql import functions as F

from iceberg_insert_spark.sources.json_ingest import (
    EVENTS_JSON_SCHEMA,
    read_events_json,
    write_fixture,
)

BASE = "/tmp/iceberg_insert_spark/ingest_tests"


def test_malformed_dropped_and_counts(spark):
    write_fixture(BASE, n_rows=200)
    df = read_events_json(spark, BASE)
    # 200 rows, every 50th malformed -> 4 dropped (App.java:235-238 parity)
    assert df.count() == 196


def test_typed_projection(spark):
    write_fixture(BASE, n_rows=100)
    df = read_events_json(spark, BASE)
    row = df.filter(F.col("event_id") == 3).first()
    assert row.component_id == "compB"
    assert row.event_date == dt.date(2024, 2, 4)
    assert row.event_ts == dt.datetime(2024, 2, 4, 3, 0, 0)
    assert row.amount == Decimal("39.03")
    assert row.ratio == 0.375
    assert row["count"] == 3  # row.count is the Row method, index instead
    assert row.active is True  # i=3 -> 3 % 3 == 0
    assert abs(row.geo.lat - 10.03) < 1e-9
    assert row.tags == ["t0", "t3"]
    assert row.attrs["k1"] == "v3"
    # TIME convention: micros-of-day (SURVEY.md §1.3)
    assert row.event_time_us == (3 * 3600 + 3 * 60 + 21) * 1_000_000


def test_missing_field_is_null(spark):
    """Row 19 omits score and geo -> nulls (App.java:223 parity)."""
    write_fixture(BASE, n_rows=100)
    df = read_events_json(spark, BASE)
    row = df.filter(F.col("event_id") == 19).first()
    assert row.score is None
    assert row.geo is None


def test_extra_field_ignored(spark):
    """Row 32 carries unknown_field -> absent from the schema (App.java:219)."""
    write_fixture(BASE, n_rows=100)
    df = read_events_json(spark, BASE)
    assert "unknown_field" not in df.columns
    assert df.filter(F.col("event_id") == 32).count() == 1


def test_compaction_preserves_rows_and_reduces_files(spark, tmp_path):
    """Many small appends -> compaction -> same rows, fewer files."""
    from pyspark.sql import functions as F

    from iceberg_insert_spark.sources.warehouse_sink import (
        append_partitioned,
        compact_partitioned,
    )
    from iceberg_insert_spark.tables import load_table

    from .conftest import SF_DIR

    path = str(tmp_path / "compact_sink")
    ev = load_table(spark, SF_DIR, "events")
    for _ in range(3):  # three micro-batches -> 3 files per partition
        append_partitioned(ev, path, "day", "ts", part_col="part_day")
    before = spark.read.parquet(path)
    n_before = before.count()
    # materialize: `before` reads files compaction is about to replace
    per_part_before = sorted(
        map(tuple, before.groupBy("part_day").count().collect())
    )
    stats = compact_partitioned(spark, path, target_rows_per_file=10_000_000)
    after = spark.read.parquet(path)
    assert after.count() == n_before == stats["rows"]
    assert stats["files_after"] < stats["files_before"]
    # content identical, not just counts
    assert per_part_before == sorted(
        map(tuple, after.groupBy("part_day").count().collect())
    )


def test_csv_fixture_semantics(spark):
    """The CSV reader must drop exactly the malformed-arity rows, unescape
    RFC 4180 "" quotes, preserve embedded newlines inside quoted fields,
    and null exactly the \\N-marked notes."""
    from iceberg_insert_spark.registry import get_queries

    from .conftest import SF_DIR

    df = get_queries()["q_ingest_csv_typed"](spark, SF_DIR)
    rows = {r.id: r for r in df.collect()}
    # 200 generated - 4 malformed (i % 50 == 49)
    assert len(rows) == 196
    assert 49 not in rows and 199 not in rows
    # "" unescaping (i=7: i%11==7 branch)
    assert rows[7].name == 'the "best" part 2'
    # embedded newline survives (i=22: i%17==5 and not an 11-residue)
    assert "\n" in rows[22].name
    # null marker -> real null (i=2: i%7==2); others non-null
    assert rows[2].note is None
    assert rows[3].note is not None


def test_orc_roundtrip_pushdown_and_fidelity(spark):
    """The ORC read-back must (a) push the status filter into the ORC
    scan (PushedFilters non-empty — stripe-stat skipping at scale) and
    (b) reproduce the parquet source bit-exactly, nulls and timestamp
    values included."""
    from iceberg_insert_spark.tables import load_table, scratch_dir

    from .conftest import SF_DIR

    orc_path = scratch_dir(spark, SF_DIR, "ingest_orc_test")
    src = load_table(spark, SF_DIR, "orders")
    src.write.option("compression", "zlib").orc(orc_path)
    back = spark.read.orc(orc_path).filter(F.col("o_orderstatus") == "F")
    p = back._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )
    pushed = next(ln for ln in p.splitlines() if "PushedFilters" in ln)
    assert "o_orderstatus" in pushed, pushed
    # full-table fidelity: the round trip loses/changes nothing
    assert (
        spark.read.orc(orc_path).exceptAll(src).count() == 0
        and src.exceptAll(spark.read.orc(orc_path)).count() == 0
    )
