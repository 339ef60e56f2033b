"""Shared fixtures: one SparkSession per test run, a DuckDB connection with
the driver's table views pre-registered, and the oracle comparison helper that
mirrors the driver's check (row count + schema-width + order-insensitive
values, with float tolerance)."""

from __future__ import annotations

import math
import os

import duckdb
import pytest

from iceberg_insert_spark.session import get_spark
from iceberg_insert_spark.tables import TABLE_NAMES

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    os.environ.setdefault("SPARK_GRAFT_CPUS", "8")
    s = get_spark("iceberg-insert-spark-tests")
    yield s
    s.stop()


@pytest.fixture(scope="session")
def ddb():
    con = duckdb.connect()
    for name in TABLE_NAMES:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM '{SF_DIR}/{name}.parquet'"
        )
    yield con
    con.close()


def _canon(v):
    """Canonicalize a cell for order-insensitive comparison.

    Floats compare BIT-EXACT (hex): every oracle query already rounds any
    engine-divergent float to <= 6 dp, and a 2026-08 audit found zero
    last-ulp divergences across all oracles at sf0.01 — so the local gate
    holds the line at the strictest possible driver hash."""
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return v.hex()
    if isinstance(v, list):
        return tuple(_canon(x) for x in v)
    if hasattr(v, "isoformat"):  # datetime/date
        return v.isoformat()
    try:  # Decimal -> str
        import decimal

        if isinstance(v, decimal.Decimal):
            return str(v.normalize())
    except Exception:
        pass
    return v


def compare_frames(spark_df, oracle_rows, oracle_cols):
    """Compare a Spark result and a DuckDB result order-insensitively.

    Columns are matched by sorted name (the driver's rule); values are
    canonicalized by _canon — floats compare BIT-EXACT via v.hex()
    (queries must round any engine-divergent float themselves; the gate
    absorbs nothing), Decimals via normalized string.
    """
    s_cols = sorted(spark_df.columns)
    d_cols = sorted(oracle_cols)
    assert s_cols == d_cols, f"column mismatch: spark={s_cols} oracle={d_cols}"
    s_idx = [spark_df.columns.index(c) for c in s_cols]
    d_idx = [list(oracle_cols).index(c) for c in d_cols]
    s_rows = sorted(
        (tuple(_canon(r[i]) for i in s_idx) for r in spark_df.collect()), key=repr
    )
    d_rows = sorted(
        (tuple(_canon(r[i]) for i in d_idx) for r in oracle_rows), key=repr
    )
    assert len(s_rows) == len(d_rows), (
        f"row count mismatch: spark={len(s_rows)} oracle={len(d_rows)}"
    )
    mismatches = [
        (i, a, b) for i, (a, b) in enumerate(zip(s_rows, d_rows)) if a != b
    ]
    assert not mismatches, f"{len(mismatches)} row mismatches, first 3: {mismatches[:3]}"
