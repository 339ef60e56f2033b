"""Footer-only data-skipping measurement (sources/file_stats.py)."""

from __future__ import annotations

from iceberg_insert_spark.sources.file_stats import (
    file_skipping_report,
    q_skipping_report,
)

from .conftest import SF_DIR


def test_sorted_layout_skips_most_files(spark):
    """Range-sorted layout must skip the large majority of files for a
    narrow range predicate; the unsorted layout must skip none — the
    measurable justification for sort-on-write."""
    rows = {r.layout: r for r in q_skipping_report(spark, SF_DIR).collect()}
    uns, srt = rows["unsorted"], rows["sorted"]
    assert uns.n_files == srt.n_files == 8
    assert uns.files_skipped == 0
    assert srt.files_skipped >= 6  # 1/16th-domain predicate over 8 ranges
    assert srt.read_frac_ppm < uns.read_frac_ppm
    assert uns.read_frac_ppm == 1_000_000  # reads everything


def test_report_counts_are_exact(spark, tmp_path):
    """The skip decision must match a real filter's row count: rows_read is
    an upper bound that equals total rows minus the rows of skipped files."""
    from pyspark.sql import functions as F

    df = spark.range(0, 10_000).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("v")
    )
    p = str(tmp_path / "t")
    df.repartitionByRange(4, "k").sortWithinPartitions("k").write.parquet(p)
    r = file_skipping_report(p, "k", 2_000, 2_499)
    assert r["n_files"] >= 4 - 1  # at least the data files
    assert r["files_skipped"] >= r["n_files"] - 2
    assert r["n_rows"] == 10_000
    # every row the predicate matches lives in a non-skipped file
    matching = df.filter((F.col("k") >= 2_000) & (F.col("k") <= 2_499)).count()
    assert r["rows_read"] >= matching


def test_skipping_report_on_timestamp_column(spark, tmp_path):
    """Footer min/max statistics work for temporal columns too: a
    day-sorted events layout skips files for a narrow ts range."""
    import datetime

    from pyspark.sql import functions as F

    from iceberg_insert_spark.tables import load_table

    ev = load_table(spark, SF_DIR, "events").select("event_id", "ts")
    p = str(tmp_path / "ev")
    ev.repartitionByRange(6, "ts").sortWithinPartitions("ts").write.parquet(p)
    lo = datetime.datetime(2024, 1, 14)
    hi = datetime.datetime(2024, 1, 16)
    r = file_skipping_report(p, "ts", lo, hi)
    assert r["files_skipped"] >= 4  # 2 of ~30 days -> most of 6 ranges skip
    assert r["rows_read"] < r["n_rows"]
