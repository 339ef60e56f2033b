#!/usr/bin/env python
"""Second scale point for the r11 transactional-DML and CDC additions
(r11 verdict #8): the commit-flat claim was measured on a synthetic
file-count ladder (tools/txn_dml_scale_probe.py); this probe measures
the REAL workload shape — one staged transaction running DELETE +
UPDATE + MERGE (full clause set, incl. WHEN NOT MATCHED BY SOURCE)
over TPC-H-derived tables — at sf0.1 and the synthesized sf1 (10x,
tools/sf1_probe.py's key-shifted replication), plus a changelog-STREAM
consume of the merge's delta.

Columns and their allowed scaling:
  * stage_sec      — the verbs' data IO (CoW rewrite + changelog
                     derivation + staged writes): tracks the touched
                     data, exponent <= ~1 (linear);
  * commit_sec     — the registry CAS + per-table metadata publishes:
                     must stay FLAT (exponent ~0) — the 100 TB claim;
  * bootstrap_sec  — the CDC subscriber's first full-insert batch:
                     O(table), exponent <= ~1;
  * consume_sec    — the merge-delta changelog batch: O(churn), NOT
                     O(table) — exponent <= ~1 vs the 10x churn.

Anything superlinear is a finding, not noise — name it in SCALE.md.

    python tools/txn_sf_probe.py      # paste the table into SCALE.md
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from iceberg_insert_spark.session import get_spark  # noqa: E402
from iceberg_insert_spark.sources.catalog import LocalCatalog  # noqa: E402
from iceberg_insert_spark.streaming.file_stream import (  # noqa: E402
    changelog_stream_available_now,
)
from iceberg_insert_spark.tables import load_table, scratch_dir  # noqa: E402


def measure(spark, sf_label: str, sf_dir: str) -> dict:
    base = scratch_dir(spark, sf_dir, f"txn_sf_probe_{sf_label}")
    cat = LocalCatalog(os.path.join(base, "cat"))
    cat.create_namespace("p")
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    c = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment", "c_acctbal"
    )
    cat.create_table("p.fact").append(o)
    cat.create_table("p.dim").append(c)
    mrg = cat.create_table("p.mrg")
    mrg.append(o)
    k = F.col("o_orderkey")
    src_df = (
        o.filter(k % 10 == 1)
        .select(
            "o_orderkey",
            F.lit("Z").alias("o_orderstatus"),
            F.lit(0.0).alias("o_totalprice"),
            F.lit("upd").alias("action"),
            (F.col("o_totalprice") + 1.0).alias("new_price"),
        )
        .unionByName(
            o.filter(k % 10 == 2).select(
                "o_orderkey",
                F.lit("Z").alias("o_orderstatus"),
                F.lit(0.0).alias("o_totalprice"),
                F.lit("del").alias("action"),
                F.lit(None).cast("double").alias("new_price"),
            )
        )
        .unionByName(
            o.filter(k % 10 == 3).select(
                (k + 10_000_000_000).alias("o_orderkey"),
                F.lit("N").alias("o_orderstatus"),
                "o_totalprice",
                F.lit("ins").alias("action"),
                F.lit(None).cast("double").alias("new_price"),
            )
        )
        .localCheckpoint(eager=True)  # pin the source batch: the
        # probe times the MERGE machinery, not re-derivation of src
    )
    n_rows = o.count()

    # CDC subscriber bootstraps BEFORE the transaction, so the second
    # drain below consumes exactly the merge's changelog batch
    ckpt = os.path.join(base, "cdc_ckpt")
    consumed: list[tuple[int, float]] = []

    def process(batch, v):
        t0 = time.perf_counter()
        n = batch.count()
        consumed.append((n, time.perf_counter() - t0))

    t0 = time.perf_counter()
    changelog_stream_available_now(
        spark, cat.load_table("p.mrg"), ckpt, process
    )
    bootstrap_sec = time.perf_counter() - t0

    t0 = time.perf_counter()
    txn = cat.begin_transaction()
    txn.delete_where(
        spark, "p.fact", "o_orderkey % 5 = 0 AND o_orderstatus = 'F'"
    )
    txn.update_where(
        spark,
        "p.dim",
        "c_mktsegment = 'BUILDING'",
        {"c_acctbal": "round(c_acctbal + 100.0, 2)"},
    )
    txn.merge_into(
        spark,
        "p.mrg",
        src_df,
        key="o_orderkey",
        matched=[
            ("delete", "s.action = 'del'"),
            ("update", None, {
                "o_totalprice": "s.new_price",
                "o_orderstatus": "'U'",
            }),
        ],
        not_matched=("insert", None),
        not_matched_by_source=[
            ("update", "t.o_orderstatus = 'F'",
             {"o_orderstatus": "'X'"}),
        ],
    )
    stage_sec = time.perf_counter() - t0
    t0 = time.perf_counter()
    heads = txn.commit()
    commit_sec = time.perf_counter() - t0

    consumed.clear()
    t0 = time.perf_counter()
    changelog_stream_available_now(
        spark, cat.load_table("p.mrg"), ckpt, process
    )
    consume_sec = time.perf_counter() - t0
    churn_rows = sum(n for n, _ in consumed)

    # honesty pins: the txn really applied (sizes move with sf)
    n_fact = cat.load_table("p.fact").read(spark).count()
    n_mrg = cat.load_table("p.mrg").read(spark).count()
    assert n_fact < n_rows and n_mrg > 0 and len(heads) == 3
    return {
        "sf": sf_label,
        "rows": n_rows,
        "churn_rows": churn_rows,
        "stage_sec": round(stage_sec, 3),
        "commit_sec": round(commit_sec, 3),
        "bootstrap_sec": round(bootstrap_sec, 3),
        "consume_sec": round(consume_sec, 3),
    }


def main() -> None:
    try:
        load0 = round(os.getloadavg()[0], 2)
    except OSError:
        load0 = None
    spark = get_spark("txn-sf-probe")
    spark.sparkContext.setLogLevel("FATAL")
    from sf1_probe import BASE, SF1, synthesize

    synthesize(spark)
    r01 = measure(spark, "sf0.1", BASE)
    r1 = measure(spark, "sf1", SF1)
    exps = {
        col: round(
            math.log10(max(r1[col], 1e-4) / max(r01[col], 1e-4)), 2
        )
        for col in (
            "stage_sec", "commit_sec", "bootstrap_sec", "consume_sec",
        )
    }
    print(json.dumps(r01))
    print(json.dumps(r1))
    print(
        json.dumps(
            {
                "probe": "txn_dml_cdc_sf_scaling",
                "load_avg_1m_at_start": load0,
                "exponents_log10_per_10x": exps,
                "rows": [r01, r1],
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
