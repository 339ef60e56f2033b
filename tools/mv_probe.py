#!/usr/bin/env python
"""Scale probe for incremental MV maintenance (sources/catalog_mv.py):
the module's 100 TB claim is that a refresh after a bounded churn costs
the churn, not the corpus. Measured here directly — the same FIXED
churn (an append batch, then a CDC retraction of it) applied to a base
table at sf0.1 and at the synthesized sf1 (10x, tools/sf1_probe.py's
key-shifted replication), timing each refresh path:

  * bootstrap_sec   — the first (augmented full) refresh: O(base),
                      exponent <= ~1 by design;
  * full_sec        — a forced mode="full" recompute at head: the
                      comparison baseline, O(base);
  * inc_append_sec  — incremental refresh of the append delta: reads
                      only the range's delta files + MV-sized storage,
                      exponent ~0 at fixed churn — THE claim;
  * inc_retract_sec — incremental refresh of the retraction (CDC merge
                      delete of the same batch): the changelog's delete
                      side joins old images against the from-snapshot
                      state, which is O(base) scan-bounded but
                      broadcast-pruned — exponent well under 1 is the
                      acceptance bar, flat is the hope.

Anything superlinear is a finding, not noise — name it in SCALE.md.

    python tools/mv_probe.py      # paste the table into SCALE.md
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
from iceberg_insert_spark.tables import load_table, scratch_dir  # noqa: E402

MV_SQL = """
    SELECT o_orderstatus, COUNT(*) AS n_orders,
           CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))
                AS BIGINT) AS cents
    FROM {{p.orders}}
    GROUP BY o_orderstatus
"""


def measure(spark, sf_label: str, sf_dir: str, churn_src_dir: str) -> dict:
    base = scratch_dir(spark, sf_dir, f"mv_probe_{sf_label}")
    cat = LocalCatalog(os.path.join(base, "cat"))
    cat.create_namespace("p")
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    t = cat.create_table("p.orders")
    t.append(o)
    n_rows = o.count()
    cat.create_materialized_view("p.mv", MV_SQL)

    t0 = time.perf_counter()
    r = cat.refresh_materialized(spark, "p.mv", mode="incremental")
    bootstrap_sec = time.perf_counter() - t0
    assert r["mode"] == "bootstrap"

    # FIXED churn at every sf: a key-disjoint batch cut from the sf0.1
    # source (identical row count at both scale points, pinned so the
    # probe times the refresh, not the derivation)
    churn = (
        load_table(spark, churn_src_dir, "orders")
        .select("o_orderkey", "o_orderstatus", "o_totalprice")
        .filter(F.col("o_orderkey") % 149 == 0)
        .withColumn("o_orderkey", F.col("o_orderkey") + 20_000_000_000)
        .localCheckpoint(eager=True)
    )
    churn_rows = churn.count()

    t.append(churn)
    t0 = time.perf_counter()
    r = cat.refresh_materialized(spark, "p.mv", mode="incremental")
    inc_append_sec = time.perf_counter() - t0
    assert r["mode"] == "incremental", r

    t.merge(
        spark,
        churn.withColumn("_op", F.lit("D")),
        key="o_orderkey",
        op_col="_op",
    )
    t0 = time.perf_counter()
    r = cat.refresh_materialized(spark, "p.mv", mode="incremental")
    inc_retract_sec = time.perf_counter() - t0
    assert r["mode"] == "incremental", r

    t0 = time.perf_counter()
    cat.refresh_materialized(spark, "p.mv", mode="full")
    full_sec = time.perf_counter() - t0

    # honesty pin: the maintained path and the recompute agree
    df, hit = cat.read_materialized(spark, "p.mv")
    got = {tuple(x) for x in df.collect()}
    exp = {
        tuple(x)
        for x in t.read(spark)
        .groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(
                F.expr("CAST(ROUND(o_totalprice * 100) AS BIGINT)")
            ).alias("cents"),
        )
        .collect()
    }
    assert hit and got == exp
    return {
        "sf": sf_label,
        "rows": n_rows,
        "churn_rows": churn_rows,
        "bootstrap_sec": round(bootstrap_sec, 3),
        "inc_append_sec": round(inc_append_sec, 3),
        "inc_retract_sec": round(inc_retract_sec, 3),
        "full_sec": round(full_sec, 3),
    }


def main() -> None:
    try:
        load0 = round(os.getloadavg()[0], 2)
    except OSError:
        load0 = None
    spark = get_spark("mv-probe")
    spark.sparkContext.setLogLevel("FATAL")
    from sf1_probe import BASE, SF1, synthesize

    synthesize(spark)
    # warmup pass at sf0.001: everything here is seconds-scale, so the
    # first pass otherwise pays JVM/codegen warmup and skews the sf0.1
    # row high (observed: negative exponents, i.e. sf1 "faster")
    measure(spark, "warmup", "/root/testdata/sf0.001", "/root/testdata/sf0.001")
    r01 = measure(spark, "sf0.1", BASE, BASE)
    r1 = measure(spark, "sf1", SF1, BASE)
    exps = {
        col: round(
            math.log10(max(r1[col], 1e-4) / max(r01[col], 1e-4)), 2
        )
        for col in (
            "bootstrap_sec",
            "inc_append_sec",
            "inc_retract_sec",
            "full_sec",
        )
    }
    print(json.dumps(r01))
    print(json.dumps(r1))
    print(
        json.dumps(
            {
                "probe": "catalog_mv_sf_scaling",
                "load_avg_1m_at_start": load0,
                "exponents_log10_per_10x": exps,
                "rows": [r01, r1],
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
