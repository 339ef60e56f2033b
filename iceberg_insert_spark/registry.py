"""Central query registry.

Every operator in SURVEY.md §2 is exposed as a named query:

    @query("q_filter_pred", oracle=\"\"\"SELECT ... \"\"\")
    def q_filter_pred(spark, sf_dir) -> DataFrame: ...

``oracle`` is the DuckDB-ANSI-SQL twin run by the driver's correctness harness
(tables pre-registered as views). Queries without an oracle (approx/LSH/ML/
ingest) get the driver's weaker rows-only check.

Column-name contract: the driver sorts columns by name before value-hashing,
so every computed column is aliased identically in the DataFrame code and the
oracle SQL.
"""

from __future__ import annotations

import importlib
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

_QUERIES: dict[str, QueryFn] = {}
_ORACLES: dict[str, str] = {}

# Modules that register queries on import.
_MODULES = [
    "iceberg_insert_spark.operators.relational",
    "iceberg_insert_spark.operators.joins",
    "iceberg_insert_spark.operators.subqueries",
    "iceberg_insert_spark.operators.aggregations",
    "iceberg_insert_spark.operators.windows",
    "iceberg_insert_spark.operators.sorts_sets",
    "iceberg_insert_spark.operators.functions",
    "iceberg_insert_spark.operators.partitions",
    "iceberg_insert_spark.operators.streaming_twins",
    "iceberg_insert_spark.operators.tpch",
    "iceberg_insert_spark.operators.udf",
    "iceberg_insert_spark.operators.graph",
    "iceberg_insert_spark.operators.cost",
    "iceberg_insert_spark.llm.dedup",
    "iceberg_insert_spark.llm.similarity",
    "iceberg_insert_spark.llm.text",
    "iceberg_insert_spark.llm.quality",
    "iceberg_insert_spark.llm.bpe",
    "iceberg_insert_spark.llm.multimodal",
    "iceberg_insert_spark.llm.langid",
    "iceberg_insert_spark.llm.vecindex",
    "iceberg_insert_spark.sources.json_ingest",
    "iceberg_insert_spark.sources.csv_ingest",
    "iceberg_insert_spark.sources.orc_ingest",
    "iceberg_insert_spark.sources.warehouse_sink",
    "iceberg_insert_spark.sources.schema_evolution",
    "iceberg_insert_spark.sources.partition_evolution",
    "iceberg_insert_spark.sources.snapshots",
    "iceberg_insert_spark.sources.row_deletes",
    "iceberg_insert_spark.sources.incremental_mv",
    "iceberg_insert_spark.sources.catalog",
    "iceberg_insert_spark.sources.result_cache",
    "iceberg_insert_spark.sources.file_stats",
]

_loaded = False

# Driver-window rotation. The driver's correctness harness hashes only the
# FIRST 50 queries in queries() iteration order per round, so queries()
# emission order decides which operators get an INDEPENDENT check each round.
# Rounds 1-2 steered this with a hand-maintained name list; per round-2
# ADVICE, the ordering is now DERIVED from the recorded coverage data
# (CORRECTNESS_r*.json committed at the repo root), so it cannot drift when
# queries are added or renamed:
#   group 0 — never driver HASH-checked AND oracled (a first hash check is
#             the most information per slot). This includes queries whose
#             only driver rows are rows-only ("no_oracle") from BEFORE an
#             oracle upgrade: the new oracle has never been exercised, so
#             it outranks stale-green rotation (round-5 case: the five
#             rows-only -> oracled upgrades);
#   group 1 — driver-checked but NOT fully green last time (red hash or a
#             harness error): re-verifying a fix outranks first-checking a
#             rows-only query, whose driver check is weak (row count only);
#   group 2 — never driver-checked, rows-only;
#   group 3 — green, oldest round first (staleness rotation).
# Ties break by registration order. If no correctness files exist (fresh
# clone), everything is group 0/2 and registration order is preserved.


def _driver_history() -> dict[str, tuple[int, bool, bool]]:
    """name -> (last round with a driver row, was that row fully clean,
    was it a rows-only row — i.e. err == "no_oracle")."""
    import json
    import re
    from pathlib import Path

    hist: dict[str, tuple[int, bool, bool]] = {}
    root = Path(__file__).resolve().parent.parent
    # sort by PARSED round number, not filename: lexicographic order breaks
    # the moment round numbers outgrow the current zero-padding (r100 would
    # sort before r20 and an older file would overwrite the latest verdict)
    found: list[tuple[int, Path]] = []
    for f in root.glob("CORRECTNESS_r*.json"):
        m = re.search(r"r(\d+)", f.name)
        if m:
            found.append((int(m.group(1)), f))
    for rnd, f in sorted(found):
        try:
            data = json.loads(f.read_text())
        except (OSError, ValueError):
            continue
        for name, row in data.items():
            clean = (
                row.get("err") in (None, "no_oracle")
                and row.get("hash_match") is not False
                and row.get("rows_match") is not False
                and row.get("schema_match") is not False
            )
            hist[name] = (rnd, clean, row.get("err") == "no_oracle")
    return hist


def _prioritized(d: dict) -> dict:
    hist = _driver_history()
    reg_order = {n: i for i, n in enumerate(d)}

    def key(n: str):
        if n not in hist:
            return (0 if n in _ORACLES else 2, 0, reg_order[n])
        rnd, clean, rows_only = hist[n]
        if n in _ORACLES and rows_only:
            # oracle added since the last driver row: never hash-checked
            return (0, rnd, reg_order[n])
        if not clean:
            return (1, rnd, reg_order[n])
        return (3, rnd, reg_order[n])

    return {n: d[n] for n in sorted(d, key=key)}


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    def deco(fn: QueryFn) -> QueryFn:
        if name in _QUERIES:
            raise ValueError(f"duplicate query name: {name}")
        _QUERIES[name] = fn
        if oracle is not None:
            _ORACLES[name] = oracle.strip()
        return fn

    return deco


def _ensure_loaded() -> None:
    global _loaded
    if _loaded:
        return
    for mod in _MODULES:
        importlib.import_module(mod)
    _loaded = True


def get_queries() -> dict[str, QueryFn]:
    _ensure_loaded()
    return _prioritized(_QUERIES)


def get_oracles() -> dict[str, str]:
    _ensure_loaded()
    return _prioritized(_ORACLES)
