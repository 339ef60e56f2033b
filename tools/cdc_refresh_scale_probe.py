"""Scale probe for the CDC-driven index refresh (r10 centerpiece,
llm/vecindex.refresh_vector_index_cdc): refresh wall time vs CHURN
FRACTION at a fixed corpus, the read-side cost of the accumulated
equality-delete debt, and the compact fold that clears it. Run on a
quiet host; numbers land in SCALE.md (r10).

The claim under test: a CDC refresh costs O(|changelog|) encode + one
metadata merge commit — NOT O(corpus) — so the time column should
track the churn column, not the corpus column; and the delete debt's
read tax is one broadcast anti-join, cleared by one compact.

    python tools/cdc_refresh_scale_probe.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from iceberg_insert_spark.llm import vecindex as V  # noqa: E402
from iceberg_insert_spark.session import get_spark  # noqa: E402
from iceberg_insert_spark.sources.snapshots import SnapshotTable  # noqa: E402
from iceberg_insert_spark.tables import load_table, scratch_dir  # noqa: E402

CHURN_PCT = (1, 5, 10, 25)


def main() -> None:
    spark = get_spark("cdc-refresh-scale-probe")
    spark.sparkContext.setLogLevel("ERROR")
    # default sf0.1; pass the sf1_probe synthesis dir for a corpus
    # big enough that the churn term rises above job latency
    d = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    emb = load_table(spark, d, "embeddings").select(
        "vec_id", "label", "embedding"
    )
    n_corpus = emb.count()
    out = []
    for pct in CHURN_PCT:
        base = scratch_dir(spark, d, f"cdc_probe_{pct}")
        src = SnapshotTable(f"{base}/src")
        src.append(emb)
        path = f"{base}/idx"
        V.build_vector_index(spark, src, path)
        # churn = pct% of the corpus: half updates, half deletes.
        # Split by the QUOTIENT's parity, not the id's (review catch,
        # r10: every multiple of an even mod is even, so an id-parity
        # split put zero rows in the delete half and the probe
        # measured an all-update churn while claiming half/half)
        mod = max(2, round(100 / pct))
        hit = F.col("vec_id") % mod == 0
        upd = emb.filter(
            hit & ((F.col("vec_id") / mod).cast("long") % 2 == 0)
        ).select(
            "vec_id",
            "label",
            F.reverse("embedding").alias("embedding"),
            F.lit("U").alias("_op"),
        )
        dele = emb.filter(
            hit & ((F.col("vec_id") / mod).cast("long") % 2 == 1)
        ).select(
            "vec_id", "label", "embedding", F.lit("D").alias("_op")
        )
        n_upd, n_del = upd.count(), dele.count()
        assert n_del > 0, "delete half empty — churn model broken"
        n_churn = n_upd + n_del
        src.merge(spark, upd.unionByName(dele), key="vec_id")
        t0 = time.time()
        V.refresh_vector_index_cdc(spark, src, path)
        t_refresh = time.time() - t0
        idx = V._index_handle(path)
        # read tax while the delete debt is live, then after compact
        t0 = time.time()
        n_live = idx.read(spark).count()
        t_read_debt = time.time() - t0
        t0 = time.time()
        idx.compact(spark, target_files=V.VI_CELLS)
        t_compact = time.time() - t0
        t0 = time.time()
        n_live2 = idx.read(spark).count()
        t_read_clean = time.time() - t0
        assert n_live == n_live2
        out.append(
            {
                "corpus": n_corpus,
                "churn_pct": pct,
                "churn_rows": n_churn,
                "churn_updates": n_upd,
                "churn_deletes": n_del,
                "refresh_sec": round(t_refresh, 2),
                "read_with_debt_sec": round(t_read_debt, 2),
                "compact_sec": round(t_compact, 2),
                "read_clean_sec": round(t_read_clean, 2),
            }
        )
        print(json.dumps(out[-1]))
    print(json.dumps({"metric": "cdc_refresh_scale", "rows": out}))


if __name__ == "__main__":
    main()
