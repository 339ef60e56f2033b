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
    "iceberg_insert_spark.operators.udf",
    "iceberg_insert_spark.llm.dedup",
    "iceberg_insert_spark.llm.similarity",
    "iceberg_insert_spark.llm.text",
    "iceberg_insert_spark.llm.multimodal",
    "iceberg_insert_spark.sources.json_ingest",
    "iceberg_insert_spark.sources.warehouse_sink",
]

_loaded = False


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
    return dict(_QUERIES)


def get_oracles() -> dict[str, str]:
    _ensure_loaded()
    return dict(_ORACLES)
