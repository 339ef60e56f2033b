"""Unit tier (SURVEY.md §5.2): partition-transform math mirroring
Utile.java:14-71, including the epoch-day and year*12 edge cases."""

from __future__ import annotations

import datetime as dt

import pytest

from pyspark.sql import Row
from pyspark.sql import functions as F

from iceberg_insert_spark.operators.partitions import transform_column


def _eval(spark, transform, value, spark_type):
    df = spark.createDataFrame([Row(v=value)], schema=f"v {spark_type}")
    return df.select(transform_column(transform, "v").alias("out")).first().out


@pytest.mark.parametrize(
    "ts, expected_epoch_day",
    [
        (dt.datetime(1970, 1, 1, 5, 0), 0),
        (dt.datetime(1970, 1, 2, 0, 0), 1),
        (dt.datetime(2024, 2, 29, 23, 59), (dt.date(2024, 2, 29) - dt.date(1970, 1, 1)).days),
        (dt.datetime(1969, 12, 31, 12, 0), -1),  # pre-epoch negative day
    ],
)
def test_day_transform_epoch_day(spark, ts, expected_epoch_day):
    """day = LocalDate.toEpochDay (Utile.java:37-39)."""
    assert _eval(spark, "day", ts, "timestamp_ntz") == expected_epoch_day


@pytest.mark.parametrize(
    "ts, expected",
    [
        (dt.datetime(1970, 1, 15), 0),        # month 0
        (dt.datetime(1970, 12, 1), 11),
        (dt.datetime(1971, 1, 1), 12),        # year rollover
        (dt.datetime(2024, 6, 30), (2024 - 1970) * 12 + 5),
    ],
)
def test_month_transform(spark, ts, expected):
    """month = (year-1970)*12 + month-1 relative form of Utile.java:40-43.

    (The reference computes year*12+month-1 on the *absolute* year; Iceberg's
    transform is months since epoch. Our q_part_month oracle uses the
    reference's absolute form; transform_column matches it.)
    """
    absolute = _eval(spark, "month", ts, "timestamp_ntz")
    assert absolute == ts.year * 12 + ts.month - 1
    assert absolute - (1970 * 12) == expected


def test_year_transform(spark):
    assert _eval(spark, "year", dt.datetime(2024, 12, 31, 23, 59), "timestamp_ntz") == 2024


def test_hour_transform_is_hours_since_epoch(spark):
    """Iceberg-spec hours-since-epoch (documented deviation from the
    reference's hour-of-day, Utile.java:47-49)."""
    ts = dt.datetime(1970, 1, 2, 3, 30)
    assert _eval(spark, "hour", ts, "timestamp_ntz") == 27


@pytest.mark.parametrize("key, n, expected", [(35, 16, 3), (16, 16, 0), (-3, 16, 13)])
def test_bucket_transform_pmod(spark, key, n, expected):
    """Deterministic pmod bucketing (not the reference's hashCode bug,
    Utile.java:63; not Murmur3 — that lives in the Iceberg writer)."""
    assert _eval(spark, f"bucket[{n}]", key, "bigint") == expected


def test_identity_transform(spark):
    assert _eval(spark, "identity", "abc", "string") == "abc"


def test_unknown_transform_raises():
    with pytest.raises(ValueError):
        transform_column("truncate", "x")
