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


def test_bloom_prefilter_no_false_negatives_and_reduces(spark):
    """The Bloom prefilter contract: (a) ZERO false negatives — every
    dim key passes the probe (a lost key would silently drop join rows
    and the oracle would catch it only by luck of the data); (b) real
    reduction — the prefiltered fact is a small fraction of the full
    fact for a selective dim; (c) the measured false-positive rate on
    known-non-members stays under the analytic bound."""
    import math

    from pyspark.sql import functions as F

    from iceberg_insert_spark.operators.joins import (
        BLOOM_K,
        BLOOM_M_BITS,
        bloom_build,
        bloom_might_contain,
    )

    dim = spark.range(0, 4000, 2).withColumnRenamed("id", "k")  # evens
    bloom = bloom_build(dim, "k")
    # (a) every member passes
    probe = spark.range(0, 4000).withColumnRenamed("id", "k")
    passed = probe.filter(bloom_might_contain(bloom, "k"))
    got = {r.k for r in passed.collect()}
    members = set(range(0, 4000, 2))
    assert members <= got
    # (c) fp rate on the 2000 known non-members under 2x analytic bound
    n = 2000
    analytic = (1 - math.exp(-BLOOM_K * n / BLOOM_M_BITS)) ** BLOOM_K
    fp = len(got - members) / 2000
    assert fp <= max(2 * analytic, 0.02), (fp, analytic)
    # (b) a selective dim really shrinks the fact side
    fact = spark.range(100000).withColumnRenamed("id", "k")
    kept = fact.filter(bloom_might_contain(bloom, "k")).count()
    assert kept < 100000 * 0.1  # 2k members + fp ≪ 10%
