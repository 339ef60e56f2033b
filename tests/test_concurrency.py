"""Concurrent-query safety: one SparkSession serving interleaved queries
over DIFFERENT datasets must keep results isolated.

The hazard is session-global state (temp views); a fixed view name would let
a concurrent caller at another sf_dir swap the table underneath a running
query. View names are sf-scoped (operators/subqueries.py) — this test is the
regression guard: 4 threads x (sf0.001 | sf0.01) x view-registering queries,
every result must equal its single-threaded value.
"""

from __future__ import annotations

from concurrent.futures import ThreadPoolExecutor

from iceberg_insert_spark.registry import get_queries

QUERIES = get_queries()
SF_A = "/root/testdata/sf0.001"
SF_B = "/root/testdata/sf0.01"

# queries that register temp views (the shared-session hazard) + a plain one
NAMES = ["q_subq_scalar", "q_subq_in", "q_agg_grouping_sets", "q_agg_groupby"]


def _run(spark, name, sf):
    return sorted(map(tuple, QUERIES[name](spark, sf).collect()), key=repr)


def test_interleaved_queries_are_isolated(spark):
    expected = {
        (name, sf): _run(spark, name, sf)
        for name in NAMES
        for sf in (SF_A, SF_B)
    }
    jobs = [(name, sf) for name in NAMES for sf in (SF_B, SF_A)] * 2
    with ThreadPoolExecutor(max_workers=8) as pool:
        futures = [
            (name, sf, pool.submit(_run, spark, name, sf)) for name, sf in jobs
        ]
        for name, sf, fut in futures:
            assert fut.result() == expected[(name, sf)], (
                f"{name}@{sf} diverged under concurrency"
            )
