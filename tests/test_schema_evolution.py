"""Schema evolution (sources/schema_evolution.py): Iceberg ALTER semantics
on the local parquet sink — metadata-only DDL, per-version read resolution,
widening whitelist. The full round-trip is also DuckDB-oracled via
q_schema_evolution in tests/test_oracle.py; these tests pin the DDL edge
cases the oracle query doesn't reach."""

from __future__ import annotations

import shutil
import uuid

import pytest
from pyspark.sql import types as T

from iceberg_insert_spark.sources.schema_evolution import EvolvingTable

BASE = "/tmp/iceberg_insert_spark/evolve_tests"


@pytest.fixture
def table_path():
    p = f"{BASE}/{uuid.uuid4().hex[:12]}"
    yield p
    shutil.rmtree(p, ignore_errors=True)


def _make(spark, table_path):
    tbl = EvolvingTable(table_path)
    tbl.create(
        T.StructType(
            [
                T.StructField("id", T.IntegerType()),
                T.StructField("score", T.FloatType()),
            ]
        )
    )
    tbl.append(
        spark.createDataFrame(
            [(1, 1.5), (2, 0.1)], "id int, score float"
        )
    )
    return tbl


def test_add_column_old_files_read_null(spark, table_path):
    tbl = _make(spark, table_path)
    tbl.add_column("tag", T.StringType())
    tbl.append(spark.createDataFrame([(3, 2.5, "new")], tbl.current_schema()))
    rows = {r.id: (r.score, r.tag) for r in tbl.read(spark).collect()}
    assert rows[1] == (1.5, None)
    assert rows[3] == (2.5, "new")


def test_widen_float_to_double_is_value_exact(spark, table_path):
    # 0.1f is NOT 0.1 in double: the promotion must surface the float's
    # exact value, not a re-parse of the literal.
    tbl = _make(spark, table_path)
    tbl.widen_column("score", T.DoubleType())
    tbl.widen_column("id", T.LongType())
    rows = {r.id: r.score for r in tbl.read(spark).collect()}
    import struct

    f32_of_01 = struct.unpack("f", struct.pack("f", 0.1))[0]
    assert rows[2] == f32_of_01
    assert isinstance(rows[2], float)
    schema = tbl.read(spark).schema
    assert schema["id"].dataType == T.LongType()
    assert schema["score"].dataType == T.DoubleType()


def test_narrowing_and_unknown_promotions_raise(spark, table_path):
    tbl = _make(spark, table_path)
    with pytest.raises(ValueError, match="illegal promotion"):
        tbl.widen_column("id", T.ShortType())
    with pytest.raises(ValueError, match="illegal promotion"):
        tbl.widen_column("score", T.StringType())
    with pytest.raises(ValueError, match="no such column"):
        tbl.widen_column("missing", T.LongType())
    with pytest.raises(ValueError, match="already exists"):
        tbl.add_column("id", T.LongType())
    # failed DDL must not have bumped the version
    assert tbl.current_version == 1


def test_old_files_never_rewritten(spark, table_path):
    import os

    tbl = _make(spark, table_path)
    v1_dir = f"{table_path}/_v=1"
    before = {
        f: os.path.getmtime(os.path.join(v1_dir, f))
        for f in os.listdir(v1_dir)
        if f.endswith(".parquet")
    }
    tbl.add_column("tag", T.StringType())
    tbl.append(spark.createDataFrame([(9, 9.0, "x")], tbl.current_schema()))
    tbl.read(spark).collect()
    after = {
        f: os.path.getmtime(os.path.join(v1_dir, f))
        for f in os.listdir(v1_dir)
        if f.endswith(".parquet")
    }
    assert before == after
