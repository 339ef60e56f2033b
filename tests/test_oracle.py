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
    # Driver-faithfulness guard (r2 verdict #3): the driver fetches oracle
    # results via pandas, which renders DuckDB HUGEINT/UHUGEINT as float64
    # while Spark returns int64 — the value hash then diverges even though
    # this gate's native fetch (HUGEINT -> Python int) stays green. Ban the
    # wide types outright so the class of red is locally reproducible.
    rel = ddb.sql(ORACLES[name])
    bad = [
        (c, str(t))
        for c, t in zip(rel.columns, rel.types)
        if str(t).upper() in ("HUGEINT", "UHUGEINT")
    ]
    assert not bad, (
        f"oracle column(s) {bad} are HUGEINT — the driver's pandas fetch "
        "renders these float64 and the value hash will mismatch; wrap in "
        "CAST(... AS BIGINT)"
    )
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
