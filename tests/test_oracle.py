"""t2-style correctness: every registered oracle query vs DuckDB at sf0.001.

This mirrors the driver's CORRECTNESS gate (which runs at sf0.01) so oracle
drift is caught locally before a round ends. Queries without an oracle get a
schema/rows smoke test instead.
"""

from __future__ import annotations

import pytest

from iceberg_insert_spark.registry import get_oracles, get_queries

from .conftest import SF_DIR, compare_frames

QUERIES = get_queries()
ORACLES = get_oracles()

ORACLE_NAMES = sorted(ORACLES)
ROWS_ONLY_NAMES = sorted(set(QUERIES) - set(ORACLES))


@pytest.mark.parametrize("name", ORACLE_NAMES)
def test_oracle_query(name, spark, ddb):
    sdf = QUERIES[name](spark, SF_DIR)
    res = ddb.execute(ORACLES[name])
    cols = [d[0] for d in res.description]
    rows = res.fetchall()
    compare_frames(sdf, rows, cols)


@pytest.mark.parametrize("name", ROWS_ONLY_NAMES)
def test_rows_only_query(name, spark):
    sdf = QUERIES[name](spark, SF_DIR)
    n = sdf.count()
    assert n >= 0
    assert len(sdf.columns) > 0
