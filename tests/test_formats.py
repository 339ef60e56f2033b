"""Source/sink format coverage: typed round-trips through every format the
engine reads and writes locally (CSV with explicit schema, ORC, JSON).

The reference reads only JSON-lines (App.java:185-209); an engine a
reference user switches to also needs the interchange formats. Parquet is
exercised everywhere else; these prove the other formats preserve types and
values bit-for-bit (timestamps through JSON lose only the NTZ/ISO spelling,
re-cast on read)."""

from __future__ import annotations

from pyspark.sql import functions as F

from iceberg_insert_spark.tables import load_table

from .conftest import SF_DIR


def _orders_sample(spark):
    return load_table(spark, SF_DIR, "orders").orderBy("o_orderkey").limit(200)


def _rows(df):
    return sorted(map(tuple, df.collect()), key=repr)


def test_csv_roundtrip_typed(spark, tmp_path):
    src = _orders_sample(spark)
    path = str(tmp_path / "orders_csv")
    src.write.mode("overwrite").option("header", True).csv(path)
    back = (
        spark.read.schema(src.schema)
        .option("header", True)
        .csv(path)
    )
    assert back.schema == src.schema
    assert _rows(back) == _rows(src)


def test_orc_roundtrip(spark, tmp_path):
    src = _orders_sample(spark)
    path = str(tmp_path / "orders_orc")
    src.write.mode("overwrite").orc(path)
    back = spark.read.orc(path)
    assert back.schema == src.schema
    assert _rows(back) == _rows(src)


def test_json_roundtrip_typed(spark, tmp_path):
    src = _orders_sample(spark)
    path = str(tmp_path / "orders_json")
    src.write.mode("overwrite").json(path)
    back = spark.read.schema(src.schema).json(path)
    assert back.schema == src.schema
    assert _rows(back) == _rows(src)


def test_csv_malformed_quarantine(spark, tmp_path):
    """CSV PERMISSIVE quarantine mirrors the JSON path: bad rows surface in
    _corrupt_record, never silently vanish."""
    p = tmp_path / "bad_csv"
    p.mkdir()
    (p / "data.csv").write_text(
        "1,2024-01-01,100.5\n" "not,a,number,extra,cols\n" "2,2024-01-02,7.25\n"
    )
    from pyspark.sql.types import (
        DoubleType,
        LongType,
        StringType,
        StructField,
        StructType,
    )

    schema = StructType(
        [
            StructField("id", LongType()),
            StructField("day", StringType()),
            StructField("amount", DoubleType()),
            StructField("_corrupt_record", StringType()),
        ]
    )
    df = (
        spark.read.schema(schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .csv(str(p))
        .cache()
    )
    assert df.filter(F.col("_corrupt_record").isNull()).count() == 2
    assert df.filter(F.col("_corrupt_record").isNotNull()).count() == 1


def test_avro_roundtrip_or_environmental_gate(spark, tmp_path):
    """Avro is the last reference-pom format (pom.xml:152-157): round-trip
    it when the external spark-avro jar is present; otherwise assert the
    gate reports absence AND that the absence is real (a write attempt
    fails with the missing-data-source error, not something else) — the
    same implemented-or-environmental bookkeeping as the Iceberg gate."""
    import pytest

    from iceberg_insert_spark.sources.warehouse_sink import avro_available

    src = _orders_sample(spark)
    path = str(tmp_path / "orders_avro")
    if avro_available(spark):
        src.write.mode("overwrite").format("avro").save(path)
        back = spark.read.format("avro").load(path)
        # avro has no native NTZ micros in this writer; timestamps survive
        # as-is through Spark's catalyst conversions, so full equality holds
        assert back.schema == src.schema
        assert _rows(back) == _rows(src)
    else:
        with pytest.raises(Exception) as ei:
            src.write.mode("overwrite").format("avro").save(path)
        msg = str(ei.value)
        assert "AVRO" in msg.upper() or "avro" in msg, msg
        pytest.skip("spark-avro jar absent (environmental; gate verified)")
