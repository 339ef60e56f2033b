#!/usr/bin/env python
"""Dump `.explain("formatted")` plans for the r13 optimization round,
to plans/r13/<name>_<suffix>.txt.

Usage:
    python tools/dump_r13_plans.py --repo /root/repo --suffix after
    python tools/dump_r13_plans.py --repo /tmp/r13_before_tree --suffix before

`--repo` selects which checkout's engine code is imported; output
always lands in /root/repo/plans/r13/.

Most r13 changes are JOB-STRUCTURE changes (probe jobs removed, guard
jobs fused/overlapped, driver-side train) that a returned frame's plan
cannot show, so besides the returned frames this also dumps INTERNAL
frames where the plan text itself is the evidence:

  * merge_guard_serial / merge_guard_fused — the MERGE guard probes as
    two standalone limit(1) plans vs ONE unioned (priority, key)
    aggregation (both reconstructed over the same scratch fixture);
  * bysource_antijoin_distinct / bysource_antijoin_nodistinct — the
    BY SOURCE broadcast anti-join build side with and without the
    removed .distinct() (one Exchange+HashAggregate gone);
  * mor_delete_dv_write — the DV staging-write frame, which now
    carries a CollectMetrics (observe) node where a separate probe
    job used to run;
  * bpe_round_argmax / bpe_sample_topn — the per-round distributed
    pair-count argmax the BPE trainer used to run ~3 jobs per round
    vs the ONE TakeOrderedAndProject sample collect that remains.
"""

from __future__ import annotations

import argparse
import os
import sys

OUT = "/root/repo/plans/r13"

QUERIES = [
    "q_catalog_merge",
    "q_catalog_script",
    "q_snapshot_merge_into",
    "q_snapshot_delete_dv",
    "q_snapshot_update_mor",
    "q_snapshot_delete_where",
    "q_text_langid_nb",
    "q_text_bpe_merges",
    "q_text_bpe_encode",
    "q_sim_ann_recall",
    "q_vecindex_recall",
    "q_snapshot_schema_evolution",
    "q_snapshot_rename_column",
    "q_snapshot_ndv",
    "q_snapshot_bloom_read",
    "q_catalog_analyze",
    "q_dedup_threshold_sweep",
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
    spark = get_spark("r13-plan-dump")
    spark.sparkContext.setLogLevel("FATAL")
    os.makedirs(OUT, exist_ok=True)
    queries = get_queries()
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )

    def dump(name: str, df, note: str = "") -> None:
        plan = df._jdf.queryExecution().explainString(mode)
        with open(f"{OUT}/{name}_{args.suffix}.txt", "w") as fh:
            fh.write(
                f"# {name} — explain(formatted), engine at "
                f"{args.repo} [{args.suffix}], sf_dir={sf_dir}\n"
            )
            if note:
                fh.write(f"# {note}\n")
            fh.write("\n" + plan.rstrip() + "\n")
        print("dumped", name)

    for name in QUERIES:
        try:
            dump(name, queries[name](spark, sf_dir))
        except Exception as exc:  # noqa: BLE001
            print("SKIP", name, f"{type(exc).__name__}: {exc}"[:120])

    # ---- internal frames (both shapes reconstructed, after-tree only)
    if args.suffix != "after":
        spark.stop()
        return
    from pyspark.sql import DataFrame, Observation
    from pyspark.sql import functions as F

    from iceberg_insert_spark.sources.snapshots import SnapshotTable
    from iceberg_insert_spark.tables import load_table, scratch_dir

    root = scratch_dir(spark, sf_dir, "r13_plan_fixture")
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    t = SnapshotTable(f"{root}/t")
    t.append(o)
    key = "o_orderkey"
    source = o.filter(F.col(key) % 10 == 1).select(
        key, F.lit("upd").alias("action")
    )
    tgt = t.read(spark)

    # MERGE guards: serial probes (r12 shape) vs fused union (r13)
    dupkeys = (
        source.groupBy(key)
        .agg(F.count(F.lit(1)).alias("__iis_c"))
        .filter(F.col("__iis_c") > 1)
        .select(key)
    )
    card_serial = tgt.select(key).join(F.broadcast(dupkeys), key).limit(1)
    skeys_nod = source.select(F.col(key).alias("__iis_sk"))
    absent = tgt.alias("t").join(
        F.broadcast(skeys_nod),
        F.col(f"t.{key}") == F.col("__iis_sk"),
        "left_anti",
    )
    routed_bs = absent.withColumn(
        "__iis_clause",
        F.when(F.col("o_orderstatus") == "F", F.lit(0)),
    )
    per_key = (
        routed_bs.select(
            F.col(f"t.{key}").alias("__iis_k"),
            F.col("__iis_clause").isNotNull().cast("int").alias(
                "__iis_routed"
            ),
        )
        .groupBy("__iis_k")
        .agg(
            F.sum("__iis_routed").alias("__iis_r"),
            F.count(F.lit(1)).alias("__iis_n"),
        )
    )
    viol = (F.col("__iis_r") > 0) & (F.col("__iis_r") < F.col("__iis_n"))
    bs_serial = per_key.filter(viol).limit(1)
    dump(
        "merge_guard_cardinality_serial",
        card_serial,
        "r12 shape: guard #1 of 2, its own limit(1).collect() job",
    )
    dump(
        "merge_guard_bysource_serial",
        bs_serial,
        "r12 shape: guard #2 of 2, its own limit(1).collect() job",
    )
    card_f = tgt.select(key).join(F.broadcast(dupkeys), key).select(
        F.lit(0).alias("__iis_why"), F.col(key).alias("__iis_k")
    )
    bs_f = per_key.filter(viol).select(
        F.when(F.col("__iis_k").isNull(), F.lit(2))
        .otherwise(F.lit(3))
        .alias("__iis_why"),
        F.col("__iis_k"),
    )
    fused = (
        card_f.unionAll(bs_f)
        .groupBy("__iis_why")
        .agg(F.max("__iis_k").alias("__iis_k"))
    )
    dump(
        "merge_guard_fused",
        fused,
        "r13 shape: every guard in ONE collect, run concurrently with "
        "the commit's staging writes (_pre_commit barrier)",
    )

    # BY SOURCE anti-join build side: distinct vs no distinct
    skeys_dist = source.select(F.col(key).alias("__iis_sk")).distinct()
    dump(
        "bysource_antijoin_distinct",
        tgt.alias("t").join(
            F.broadcast(skeys_dist),
            F.col(f"t.{key}") == F.col("__iis_sk"),
            "left_anti",
        ),
        "r12 shape: the build side pays an Exchange+HashAggregate to "
        "dedup keys the anti-join only probes for existence",
    )
    dump(
        "bysource_antijoin_nodistinct",
        absent,
        "r13 shape: same result, no dedup stage on the build side",
    )

    # MoR DELETE: DV write frame now carries CollectMetrics (observe)
    from iceberg_insert_spark.sources.snapshots.dv import build_dv_frame

    base = t._latest_published()
    scan = t._read_files(
        spark,
        base,
        t._manifest(base),
        file_col="__iis_dfile",
        pos_col="__iis_dpos",
    )
    matched = F.coalesce(
        F.expr("o_orderkey % 10 = 3").cast("boolean"), F.lit(False)
    )
    hits_plain = scan.filter(matched).select("__iis_dfile", "__iis_dpos")
    dump(
        "mor_delete_probe_before",
        hits_plain.limit(1),
        "r12 shape: the separate bounded no-match probe job",
    )
    obs = Observation()
    hits_obs = hits_plain.observe(obs, F.count(F.lit(1)).alias("n"))
    dump(
        "mor_delete_dv_write_after",
        build_dv_frame(spark, hits_obs, {}),
        "r13 shape: the staging write itself carries the hit count as "
        "a CollectMetrics node; _commit aborts pre-swap when n == 0",
    )

    # BPE: the old per-round distributed argmax vs the one sample job
    from iceberg_insert_spark.llm.bpe import (
        BPE_TRAIN_TOP_WORDS,
        END_OF_WORD,
        word_freq_table,
    )

    d = load_table(spark, sf_dir, "documents")
    words = word_freq_table(d)
    syms = words.select(
        F.concat(
            F.split(F.col("word"), ""), F.array(F.lit(END_OF_WORD))
        ).alias("syms"),
        "freq",
    )
    pairs = F.expr(
        "CASE WHEN size(syms) >= 2 THEN"
        " zip_with(slice(syms, 1, size(syms) - 1),"
        "          slice(syms, 2, size(syms) - 1),"
        "          (a, b) -> struct(a AS l, b AS r))"
        " ELSE CAST(array() AS array<struct<l: string, r: string>>) END"
    )
    round_argmax = (
        syms.select(F.explode(pairs).alias("p"), "freq")
        .groupBy(F.col("p.l").alias("l"), F.col("p.r").alias("r"))
        .agg(F.sum("freq").alias("n"))
        .orderBy(F.desc("n"), F.asc("l"), F.asc("r"))
        .limit(1)
    )
    dump(
        "bpe_round_argmax_before",
        round_argmax,
        "r12 shape: run ONCE PER MERGE ROUND (plus a checkpointed "
        "rewrite per round) — ~3 Spark jobs x BPE_MERGES",
    )
    dump(
        "bpe_sample_topn_after",
        words.orderBy(F.desc("freq"), F.asc("word")).limit(
            BPE_TRAIN_TOP_WORDS
        ),
        "r13 shape: the ONE distributed job that remains — the bounded "
        "top-N sample collect; merge rounds run on the driver over it",
    )
    spark.stop()


if __name__ == "__main__":
    main()
