"""Scale stress probe for the graph/dedup tier (round-4 verdict #8).

The near-dup -> connected-components -> PageRank chain's 100 TB posture was
design-argued but only ever MEASURED at sf0.1. This probe measures the
scaling curve directly: it synthesizes 1x / 3x / 10x corpora from the sf0.1
documents table (deterministic replication + mutation — each source doc
becomes a FAMILY of near-duplicate copies, the worst realistic shape for a
dedup pipeline because the pair graph grows quadratically in family size,
not linearly in corpus size), runs the exact n-gram pair graph -> CC ->
PageRank chain once per scale, and records rows, shuffle bytes (from the
Spark status REST API) and wall seconds per stage.

Output: one JSON line per scale; paste the table into SCALE.md.

Usage:  python tools/scale_probe.py [base_sf_dir]     (default sf0.1)
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

UI_PORT = 4049
SCALES = [1, 3, 10]
# each source doc spawns `scale` copies; copy c > 0 swaps one token at a
# deterministic position -> every family is a clique of near-dups
MUTATION = (
    "CASE WHEN _c = 0 THEN text ELSE "
    "concat_ws(' ', transform(split(text, ' '), (t, i) -> "
    "CASE WHEN i = pmod(_c * 7, size(split(text, ' '))) "
    "THEN concat('mut', _c) ELSE t END)) END"
)


_UI_BASE: list = []  # resolved from the live context, NOT the config: Spark
# silently rebinds to the next free port when UI_PORT is taken


def rest(path: str):
    with urllib.request.urlopen(
        f"{_UI_BASE[0]}/api/v1/{path}", timeout=10
    ) as r:
        return json.loads(r.read())


def shuffle_totals(app_id: str) -> tuple[int, int]:
    """Total shuffle (read, write) bytes across all completed stages."""
    stages = rest(f"applications/{app_id}/stages?status=complete")
    return (
        sum(s.get("shuffleReadBytes", 0) for s in stages),
        sum(s.get("shuffleWriteBytes", 0) for s in stages),
    )


def main() -> None:
    base_sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.appName("scale-probe")
        .master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", str(max(int(cpus), 8)))
        .config("spark.driver.memory", "8g")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "true")
        .config("spark.ui.port", str(UI_PORT))
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    _UI_BASE.append(spark.sparkContext.uiWebUrl)
    from iceberg_insert_spark.llm.dedup import (
        connected_components,
        pagerank,
        q_dedup_ngram,
    )
    from iceberg_insert_spark.session import apply_runtime_confs
    from iceberg_insert_spark.tables import load_table

    apply_runtime_confs(spark)
    app_id = spark.sparkContext.applicationId
    docs = load_table(spark, base_sf, "documents")

    for scale in SCALES:
        d = f"/tmp/iceberg_insert_spark/scale_probe/x{scale}"
        corpus = (
            docs.crossJoin(
                F.broadcast(
                    spark.range(scale).select(F.col("id").alias("_c"))
                )
            )
            .select(
                (F.col("doc_id") * 16 + F.col("_c")).alias("doc_id"),
                F.expr(MUTATION).alias("text"),
                "lang",
                "source",
                "n_chars",
                "_c",
            )
            .drop("_c")
        )
        corpus.write.mode("overwrite").parquet(f"{d}/documents.parquet")

        result = {"scale": scale, "docs": scale * docs.count()}
        r0, w0 = shuffle_totals(app_id)
        t0 = time.perf_counter()
        pairs = (
            q_dedup_ngram(spark, d)
            .select("doc_a", "doc_b")
            .localCheckpoint(eager=True)
        )
        result["pairs"] = pairs.count()
        result["pairs_sec"] = round(time.perf_counter() - t0, 2)
        r1, w1 = shuffle_totals(app_id)
        result["pairs_shuffle_mb"] = round((r1 - r0 + w1 - w0) / 2**20, 1)

        t0 = time.perf_counter()
        labels, rounds = connected_components(pairs)
        result["cc_nodes"] = labels.count()
        result["cc_rounds"] = rounds
        result["cc_sec"] = round(time.perf_counter() - t0, 2)
        r2, w2 = shuffle_totals(app_id)
        result["cc_shuffle_mb"] = round((r2 - r1 + w2 - w1) / 2**20, 1)

        t0 = time.perf_counter()
        ranks, pr_rounds = pagerank(
            pairs.select("doc_a", "doc_b"), return_rounds=True
        )
        result["pr_nodes"] = ranks.count()
        result["pr_rounds"] = pr_rounds
        result["pr_sec"] = round(time.perf_counter() - t0, 2)
        r3, w3 = shuffle_totals(app_id)
        result["pr_shuffle_mb"] = round((r3 - r2 + w3 - w2) / 2**20, 1)

        print("PROBE", json.dumps(result), flush=True)

    spark.stop()


if __name__ == "__main__":
    main()
