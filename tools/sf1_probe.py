#!/usr/bin/env python
"""sf1 headline scaling probe (r9 verdict #8).

The 2x bench gate has no reference numbers to bite on at sf0.1, so the
scale claims get a second MEASURED point: synthesize an sf1-shaped
dataset (10x sf0.1, deterministic key-shifted replication — TPC-H's
own scaling rule: customers/orders/lineitem grow with sf, nation/
region stay fixed), run the headline queries at both scales in one
session, and record the per-query scaling exponent
``log10(t_sf1 / t_sf0.1)`` (1.0 = linear, < 1 = sublinear because
fixed costs amortize, > 1 = superlinear — a named cause required).

Replication details that keep the workload shape honest:
  * every key column shifts by ``copy * span`` so joins keep their
    fan-out (each copy is a disjoint TPC-H world; cross-copy joins
    match nothing, exactly like rows added by a larger sf);
  * documents get ONE token swapped per copy (scale_probe.py's
    mutation) — plain replication would make every doc a 10-family
    of EXACT duplicates and quadratically explode the near-dup pair
    graph, which is a different experiment (scale_probe.py runs it);
  * embeddings perturb per copy (+copy * 1e-3 on each dim) so ANN
    candidate structure scales instead of degenerating to 10
    identical copies of every vector.

Usage:  python tools/sf1_probe.py          # paste the table into SCALE.md
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from iceberg_insert_spark.registry import get_queries  # noqa: E402
from iceberg_insert_spark.session import get_spark  # noqa: E402
from iceberg_insert_spark.tables import TABLE_NAMES, load_table  # noqa: E402

BASE = "/root/testdata/sf0.1"
SF1 = "/tmp/iceberg_insert_spark_probe/sf1"
COPIES = 10

HEADLINE = [
    "q_agg_groupby",  # TPC-H Q1 shape (registered under this name)
    "q_tpch_q3",
    "q_tpch_q10",
    "q_pipeline_e2e",
    "q_dedup_near",
    "q_sim_knn",
    "q_sim_knn_lsh",
    "q_sim_knn_pq",
    "q_vecindex_build",
    "q_sim_knn_ivfpq",
]

# table -> columns that shift by copy * span (span = max+1 of the
# column in sf0.1, computed below). Keys shared across tables (e.g.
# custkey) use the OWNING table's span so referential joins survive.
SHIFT_COLS = {
    "customer": ["c_custkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "part": ["p_partkey"],
    "supplier": ["s_suppkey"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
    "events": ["event_id", "user_id"],
}
SPAN_OWNER = {
    "c_custkey": ("customer", "c_custkey"),
    "o_custkey": ("customer", "c_custkey"),
    "o_orderkey": ("orders", "o_orderkey"),
    "l_orderkey": ("orders", "o_orderkey"),
    "l_partkey": ("part", "p_partkey"),
    "p_partkey": ("part", "p_partkey"),
    "l_suppkey": ("supplier", "s_suppkey"),
    "s_suppkey": ("supplier", "s_suppkey"),
    "doc_id": ("documents", "doc_id"),
    "vec_id": ("embeddings", "vec_id"),
    "event_id": ("events", "event_id"),
    "user_id": ("events", "user_id"),
}
COPY_VERBATIM = ["nation", "region"]

DOC_MUTATION = (
    "CASE WHEN _c = 0 THEN text ELSE "
    "concat_ws(' ', transform(split(text, ' '), (t, i) -> "
    "CASE WHEN i = CAST(pmod(_c * 7, greatest(size(split(text, ' ')), 1)) AS INT) "
    "THEN concat('mut', _c) ELSE t END)) END"
)


def synthesize(spark) -> None:
    if os.path.exists(os.path.join(SF1, "_DONE")):
        return
    os.makedirs(SF1, exist_ok=True)
    spans = {}
    for col, (tbl, owner_col) in SPAN_OWNER.items():
        if (tbl, owner_col) not in spans:
            spans[(tbl, owner_col)] = (
                spark.read.parquet(f"{BASE}/{tbl}.parquet")
                .agg(F.max(owner_col))
                .collect()[0][0]
                + 1
            )
    copies = spark.range(COPIES).withColumnRenamed("id", "_c")
    for t in SHIFT_COLS:
        df = spark.read.parquet(f"{BASE}/{t}.parquet")
        cols = df.columns
        out = df.crossJoin(F.broadcast(copies))
        for col in SHIFT_COLS[t]:
            span = spans[SPAN_OWNER[col]]
            out = out.withColumn(
                col, (F.col(col) + F.col("_c") * F.lit(span)).cast("long")
            )
        if t == "documents":
            out = out.withColumn("text", F.expr(DOC_MUTATION))
        if t == "embeddings":
            out = out.withColumn(
                "embedding",
                F.expr(
                    "transform(embedding, x -> CAST(x + _c * 0.001 AS FLOAT))"
                ),
            )
        (
            out.select(*cols)
            .repartition(16)
            .write.mode("overwrite")
            .parquet(f"{SF1}/{t}.parquet")
        )
    for t in COPY_VERBATIM:
        spark.read.parquet(f"{BASE}/{t}.parquet").coalesce(1).write.mode(
            "overwrite"
        ).parquet(f"{SF1}/{t}.parquet")
    open(os.path.join(SF1, "_DONE"), "w").close()


def time_query(queries, spark, name: str, sf_dir: str) -> float:
    best = None
    for _ in range(2):
        t0 = time.perf_counter()
        df = queries[name](spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    return best


def main() -> None:
    try:
        load0 = round(os.getloadavg()[0], 2)
    except OSError:
        load0 = None
    spark = get_spark("iceberg-insert-spark-sf1-probe")
    spark.sparkContext.setLogLevel("FATAL")
    synthesize(spark)
    # warmup both directories' footers + the python worker pool
    for d in (BASE, SF1):
        for t in TABLE_NAMES:
            load_table(spark, d, t).count()
    spark.range(32).groupBy((F.col("id") % 4).alias("g")).applyInPandas(
        lambda pdf: pdf, "id long"
    ).count()
    queries = get_queries()
    rows = []
    for name in HEADLINE:
        t01 = time_query(queries, spark, name, BASE)
        t1 = time_query(queries, spark, name, SF1)
        rows.append(
            {
                "query": name,
                "sf0_1_sec": round(t01, 3),
                "sf1_sec": round(t1, 3),
                "ratio": round(t1 / t01, 2),
                "exponent": round(math.log10(t1 / t01), 2),
            }
        )
        print(json.dumps(rows[-1]))
    print(
        json.dumps(
            {
                "metric": "sf1_headline_probe",
                "copies": COPIES,
                "load_avg_1m_at_start": load0,
                "rows": rows,
            }
        )
    )


if __name__ == "__main__":
    main()
