"""Salted-join equivalence: the skew-mitigation rewrite must be
row-identical to the plain join it replaces."""

from __future__ import annotations

from pyspark.sql import functions as F

from iceberg_insert_spark.operators.joins import salted_join
from iceberg_insert_spark.tables import load_table

from .conftest import SF_DIR


def test_salted_join_matches_plain_join(spark):
    o = load_table(spark, SF_DIR, "orders")
    c = load_table(spark, SF_DIR, "customer")
    plain = (
        o.join(c, o.o_custkey == c.c_custkey)
        .select("o_orderkey", "c_custkey", "o_totalprice")
    )
    salted = salted_join(o, c, "o_custkey", "c_custkey").select(
        "o_orderkey", "c_custkey", "o_totalprice"
    )
    assert sorted(map(tuple, plain.collect())) == sorted(
        map(tuple, salted.collect())
    )


def test_salted_join_spreads_hot_key(spark):
    """A 100%-skewed left side (every row the same key) must spread over
    multiple salt buckets."""
    hot = spark.range(1000).select(
        F.lit(42).alias("k"), F.col("id").alias("payload")
    )
    dim = spark.range(100).select(F.col("id").alias("k2"))
    out = salted_join(hot, dim, "k", "k2")
    assert out.count() == 1000  # k=42 matches once per left row
    n_buckets = (
        hot.withColumn(
            "_salt", F.pmod(F.xxhash64(F.monotonically_increasing_id()), 8)
        )
        .select("_salt")
        .distinct()
        .count()
    )
    assert n_buckets > 1
