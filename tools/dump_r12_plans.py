#!/usr/bin/env python
"""Dump `.explain("formatted")` plans for the queries touched in the
r12 optimization round, to plans/r12/<query>_<suffix>.txt.

Usage:
    python tools/dump_r12_plans.py --repo /root/repo --suffix after
    python tools/dump_r12_plans.py --repo /tmp/worktree_before --suffix before

`--repo` selects which checkout's engine code is imported (the before
run points at a worktree pinned to the pre-optimization commit); the
output always lands in /root/repo/plans/r12/.

Besides the returned frames, two INTERNAL frames are dumped where the
optimization reshaped a plan the query's return value doesn't show:
the q_catalog_merge audit (five scalar subqueries -> one aggregation
pass) — reconstructed standalone over the same post-merge table.
"""

from __future__ import annotations

import argparse
import os
import sys

OUT = "/root/repo/plans/r12"

QUERIES = [
    "q_catalog_merge",
    "q_catalog_dml_policies",
    "q_text_langid_nb",
    "q_dedup_clusters",
    "q_dedup_pagerank",
    "q_dedup_representatives",
    "q_snapshot_update_mor",
    "q_snapshot_delete_dv",
    "q_sim_knn_ivfpq",
    "q_sim_ann_recall",
]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--repo", default="/root/repo")
    ap.add_argument("--suffix", required=True)
    args = ap.parse_args()
    sys.path.insert(0, args.repo)

    from iceberg_insert_spark.registry import get_queries
    from iceberg_insert_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    spark = get_spark("r12-plan-dump")
    spark.sparkContext.setLogLevel("FATAL")
    os.makedirs(OUT, exist_ok=True)
    queries = get_queries()
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    for name in QUERIES:
        df = queries[name](spark, sf_dir)
        plan = df._jdf.queryExecution().explainString(mode)
        with open(f"{OUT}/{name}_{args.suffix}.txt", "w") as fh:
            fh.write(
                f"# {name} — explain(formatted), engine at "
                f"{args.repo} [{args.suffix}], sf_dir={sf_dir}\n\n"
            )
            fh.write(plan.rstrip() + "\n")
        print("dumped", name)

    # Internal frame: the q_catalog_merge audit over the post-merge
    # table (the commit above just built it in this session's scratch).
    from pyspark.sql import functions as F  # noqa: F401

    from iceberg_insert_spark.sources.catalog import LocalCatalog
    from iceberg_insert_spark.tables import scratch_dir  # noqa: F401

    import re

    tag = re.sub(r"\W", "_", sf_dir.rstrip("/").split("/")[-1])
    root = (
        "/tmp/iceberg_insert_spark/catalog_merge/"
        f"{spark.sparkContext.applicationId}/{tag}"
    )
    if os.path.isdir(root):
        cat = LocalCatalog(root)
        for label, sql in (
            (
                "audit_subqueries",
                """
                SELECT (SELECT COUNT(*) FROM {{mg.fact}}) AS post_n,
                       (SELECT CAST(SUM(CAST(ROUND(o_totalprice * 100)
                                             AS BIGINT)) AS BIGINT)
                        FROM {{mg.fact}}) AS fact_cents,
                       (SELECT COUNT(*) FROM {{mg.fact}}
                        WHERE o_orderstatus = 'U') AS n_upd,
                       (SELECT COUNT(*) FROM {{mg.fact}}
                        WHERE o_orderstatus = 'X') AS n_closed,
                       (SELECT COUNT(*) FROM {{mg.fact}}
                        WHERE o_orderkey > 1000000000) AS n_ins
                """,
            ),
            (
                "audit_onepass",
                """
                SELECT COUNT(*) AS post_n,
                       CAST(SUM(CAST(ROUND(o_totalprice * 100)
                                     AS BIGINT)) AS BIGINT) AS fact_cents,
                       COUNT(CASE WHEN o_orderstatus = 'U' THEN 1 END)
                           AS n_upd,
                       COUNT(CASE WHEN o_orderstatus = 'X' THEN 1 END)
                           AS n_closed,
                       COUNT(CASE WHEN o_orderkey > 1000000000 THEN 1 END)
                           AS n_ins
                FROM {{mg.fact}}
                """,
            ),
        ):
            df = cat.sql(spark, sql)
            plan = df._jdf.queryExecution().explainString(mode)
            with open(
                f"{OUT}/q_catalog_merge_{label}_{args.suffix}.txt", "w"
            ) as fh:
                fh.write(
                    f"# q_catalog_merge internal audit frame "
                    f"({label}) [{args.suffix}]\n\n"
                )
                fh.write(plan.rstrip() + "\n")
            print("dumped audit", label)
    spark.stop()


if __name__ == "__main__":
    main()
