"""Scale probe for transactional row-level DML (r11,
CatalogTransaction.delete_where/update_where): COMMIT wall time vs
TABLE SIZE at a fixed touched-file count. Run on a quiet host;
numbers land in SCALE.md (r11).

The claim under test: the staged CoW rewrite pays its data IO at
STAGE time (touched files only, parallel, off-main), so COMMIT — the
in-CAS base validation plus the publish's manifest delta — is pure
metadata whose cost must stay FLAT as the table grows: at 100 TB the
atomic flip of "BEGIN; DELETE …; UPDATE …; COMMIT" costs the same
milliseconds as at 1 GB. The stage column is allowed to track the
touched-file rewrite (it IS the data IO); the commit column is not
allowed to track anything.

    python tools/txn_dml_scale_probe.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from iceberg_insert_spark.session import get_spark  # noqa: E402
from iceberg_insert_spark.sources.catalog import LocalCatalog  # noqa: E402
from iceberg_insert_spark.tables import load_table, scratch_dir  # noqa: E402

N_FILES = (8, 64, 256)
ROWS_PER_FILE = 4_000


def main() -> None:
    spark = get_spark("txn-dml-scale-probe")
    spark.sparkContext.setLogLevel("ERROR")
    d = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    li = load_table(spark, d, "lineitem").select(
        "l_orderkey", "l_partkey", "l_quantity", "l_extendedprice"
    )
    out = []
    for nf in N_FILES:
        base = scratch_dir(spark, d, f"txn_dml_probe_{nf}")
        cat = LocalCatalog(base)
        cat.create_namespace("p")
        fact = cat.create_table("p.fact")
        dim = cat.create_table("p.dim")
        n_rows = nf * ROWS_PER_FILE
        # nf files, one per repartition slice; the DML predicates below
        # touch exactly the slice-0 file whatever nf is, so the data
        # rewrite is ~constant while the table (and its manifest) grows
        rows = (
            spark.range(n_rows)
            .select(
                F.col("id").alias("k"),
                (F.col("id") % nf).cast("int").alias("slice"),
                (F.col("id") % 97).cast("double").alias("v"),
            )
            # RANGE partitioning, not hash (review catch: hash
            # collides slice values into shared partitions and leaves
            # others empty, so the 'one file per slice' premise — the
            # probe's control variable — silently broke); the actual
            # file and rewrite counts are recorded below so the
            # published table states measured reality either way
            .repartitionByRange(nf, "slice")
        )
        fact.append(rows)
        dim.append(
            spark.range(1000).select(
                F.col("id").alias("d"), F.lit("x").alias("tag")
            )
        )
        n_files_actual = len(fact._manifest(fact._latest_published()))
        t0 = time.perf_counter()
        txn = cat.begin_transaction()
        sv = txn.delete_where(
            spark, "p.fact", "slice = 0 AND k % 3 = 0"
        )
        txn.update_where(
            spark, "p.dim", "d < 100", {"tag": "'probed'"}
        )
        t_stage = time.perf_counter() - t0
        n_rewritten = len(
            fact._raw_meta(sv).get("cow_drop") or ()
        )
        t0 = time.perf_counter()
        heads = txn.commit()
        t_commit = time.perf_counter() - t0
        got = cat.load_table("p.fact").read(spark)
        n_after = got.count()
        expect_deleted = (
            spark.range(n_rows)
            .filter((F.col("id") % nf == 0) & (F.col("id") % 3 == 0))
            .count()
        )
        assert n_after == n_rows - expect_deleted, (
            nf,
            n_after,
            expect_deleted,
        )
        out.append(
            {
                "files": nf,
                "files_actual": n_files_actual,
                "files_rewritten": n_rewritten,
                "rows": n_rows,
                "stage_sec": round(t_stage, 3),
                "commit_sec": round(t_commit, 3),
                "heads": heads,
            }
        )
        print(json.dumps(out[-1]))
    print(json.dumps({"probe": "txn_dml_commit_flat", "rows": out}))
    spark.stop()


if __name__ == "__main__":
    main()
