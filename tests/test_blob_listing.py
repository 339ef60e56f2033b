"""S1/S2 source listing (sources/blob_listing.py): the scheme-agnostic
Hadoop FileSystem walk that replaces the reference's Azure-SDK and
java.io.File listings (App.java:160-183, NfsApp.java:150-162). No cloud
credentials exist here, so the tests drive the IDENTICAL code path through
explicit file:// URIs — scheme resolution, recursive prefix walk, suffix
filter, deterministic order, list->read round trip."""

from __future__ import annotations

import json
import os

from pyspark.sql.types import LongType, StringType, StructField, StructType

from iceberg_insert_spark.sources.blob_listing import (
    list_source_files,
    read_listed_json,
)

SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("event_type", StringType()),
    ]
)


def _landing(tmp_path):
    base = tmp_path / "events" / "component-1"
    (base / "nested").mkdir(parents=True)
    rows = [{"event_id": i, "event_type": "view"} for i in range(6)]
    for i, chunk in enumerate([rows[:2], rows[2:4]]):
        with open(base / f"batch-{i}.json", "w") as fh:
            for r in chunk:
                fh.write(json.dumps(r) + "\n")
    with open(base / "nested" / "batch-2.json", "w") as fh:
        for r in rows[4:]:
            fh.write(json.dumps(r) + "\n")
    with open(base / "_SUCCESS.marker", "w") as fh:
        fh.write("")
    return f"file://{base}"


def test_listing_walks_scheme_uri_with_suffix_filter(spark, tmp_path):
    uri = _landing(tmp_path)
    files = list_source_files(spark, uri, suffix=".json")
    names = [os.path.basename(f) for f in files]
    assert names == ["batch-0.json", "batch-1.json", "batch-2.json"]
    assert all(f.startswith("file:") for f in files)  # fully qualified
    # non-recursive walk sees only the top level
    flat = list_source_files(spark, uri, suffix=".json", recursive=False)
    assert [os.path.basename(f) for f in flat] == ["batch-0.json", "batch-1.json"]


def test_listing_missing_prefix_is_empty_not_error(spark, tmp_path):
    assert list_source_files(spark, f"file://{tmp_path}/nope") == []


def test_list_then_read_round_trip(spark, tmp_path):
    uri = _landing(tmp_path)
    files = list_source_files(spark, uri, suffix=".json")
    df = read_listed_json(spark, files, SCHEMA)
    assert sorted(r.event_id for r in df.collect()) == list(range(6))
    # empty batch -> empty typed frame, same schema
    empty = read_listed_json(spark, [], SCHEMA)
    assert empty.count() == 0
    assert empty.schema == SCHEMA
