#!/usr/bin/env python
"""sf1 core-count scaling probe (r13, verdict item 6).

The sf0.1 bench is fixed-overhead bound — the driver's own 8-vs-32-core
pass measured ratios ≈ 1 for every query (r12 PERF scaling block), which
proves the suite's LOCAL cost is job/commit overhead, not CPU. That is
the right local diagnosis but the wrong scale evidence: the 100 TB
claim wants one measured point where compute dominates and the ratio
tracks the core count. This probe supplies it: the top compute-heavy
queries at the synthesized sf1 (tools/sf1_probe.py's deterministic 10x
replication), run twice — local[8] and local[32] — in SEPARATE
processes (the master string is fixed at session build), reporting
t_8 / t_32 per query. Queries dominated by task compute should land
well above 1 (toward 4x = the core ratio, minus Amdahl overhead);
fixture-bound queries stay near 1, exactly like the sf0.1 block.

Usage:
    python tools/sf1_core_scaling_probe.py            # orchestrates both
    python tools/sf1_core_scaling_probe.py --one 8    # one pass (internal)
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# compute-heavy picks: high task-core-seconds in the r13 job profile
# (the fixture/commit-train queries are deliberately absent — their
# sf0.1 flatness is already measured and explained)
QUERIES = [
    "q_agg_groupby",
    "q_tpch_q3",
    "q_tpch_q9",
    "q_pipeline_e2e",
    "q_dedup_ngram",
    "q_dedup_near",
    "q_basket_pairs",
    "q_basket_rules",
    "q_text_langid_nb",
    "q_docs_shuffle",
    "q_sim_knn",
    "q_sim_knn_pq",
    "q_text_boilerplate",
    "q_dedup_threshold_sweep",
    "q_win_running",
]


def one_pass(cpus: str) -> None:
    os.environ["SPARK_GRAFT_CPUS"] = cpus
    from pyspark.sql import functions as F

    from iceberg_insert_spark.registry import get_queries
    from iceberg_insert_spark.session import get_spark
    from iceberg_insert_spark.tables import TABLE_NAMES, load_table
    from tools.sf1_probe import SF1, synthesize, time_query

    spark = get_spark(f"iis-sf1-scaling-{cpus}")
    spark.sparkContext.setLogLevel("FATAL")
    synthesize(spark)
    for t in TABLE_NAMES:
        load_table(spark, SF1, t).count()
    spark.range(32).groupBy((F.col("id") % 4).alias("g")).applyInPandas(
        lambda pdf: pdf, "id long"
    ).count()
    queries = get_queries()
    out = {}
    for name in QUERIES:
        out[name] = round(time_query(queries, spark, name, SF1), 3)
    print("RESULT " + json.dumps({"cpus": int(cpus), "queries": out}))


def main() -> None:
    if len(sys.argv) > 2 and sys.argv[1] == "--one":
        one_pass(sys.argv[2])
        return
    try:
        load0 = round(os.getloadavg()[0], 2)
    except OSError:
        load0 = None
    results = {}
    for cpus in ("32", "8"):
        t0 = time.time()
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--one", cpus],
            capture_output=True,
            text=True,
            cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        )
        for line in proc.stdout.splitlines():
            if line.startswith("RESULT "):
                results[cpus] = json.loads(line[len("RESULT "):])
        if cpus not in results:
            sys.stderr.write(proc.stdout[-2000:] + proc.stderr[-2000:])
            raise SystemExit(f"pass at {cpus} cores produced no RESULT")
        sys.stderr.write(
            f"pass local[{cpus}] done in {time.time() - t0:.0f}s\n"
        )
    rows = []
    for name in QUERIES:
        t32 = results["32"]["queries"][name]
        t8 = results["8"]["queries"][name]
        rows.append(
            {
                "query": name,
                "sf1_32c_sec": t32,
                "sf1_8c_sec": t8,
                "speedup_32_over_8": round(t8 / t32, 2),
            }
        )
        print(json.dumps(rows[-1]))
    print(
        json.dumps(
            {
                "metric": "sf1_core_scaling_probe",
                "cpus": [8, 32],
                "load_avg_1m_at_start": load0,
                "rows": rows,
            }
        )
    )


if __name__ == "__main__":
    main()
