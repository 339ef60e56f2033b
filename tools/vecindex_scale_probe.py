"""Scale probe for the persisted IVF-PQ index (llm/vecindex.py):
build / refresh / query wall time, metadata pruning ratio, and code
bytes vs raw vector bytes, at each available SF. Run on a quiet host;
numbers land in SCALE.md (r9).

    python tools/vecindex_scale_probe.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from iceberg_insert_spark.session import get_spark  # noqa: E402
from iceberg_insert_spark.tables import load_table, scratch_dir  # noqa: E402
from iceberg_insert_spark.sources.snapshots import SnapshotTable  # noqa: E402
from iceberg_insert_spark.llm import vecindex as V  # noqa: E402


def main() -> None:
    spark = get_spark("vecindex-scale-probe")
    spark.sparkContext.setLogLevel("ERROR")
    out = []
    for sf in ("sf0.001", "sf0.01", "sf0.1"):
        d = f"/root/testdata/{sf}"
        if not os.path.isdir(d):
            continue
        emb = load_table(spark, d, "embeddings").select(
            "vec_id", "label", "embedding"
        )
        base = scratch_dir(spark, d, "vecindex_probe")
        src = SnapshotTable(f"{base}/src")
        src.append(emb.filter(F.col("vec_id") % 5 != 0))
        path = f"{base}/idx"

        t0 = time.time()
        idx = V.build_vector_index(spark, src, path)
        t_build = time.time() - t0

        src.append(emb.filter(F.col("vec_id") % 5 == 0))
        t0 = time.time()
        V.refresh_vector_index(spark, src, path)
        t_refresh = time.time() - t0

        t0 = time.time()
        n_res = V.query_vector_index(spark, path, src).count()
        t_query = time.time() - t0

        n = idx.read(spark).count()
        import numpy as np

        q = V._load_quantizer(path, idx)
        cents = np.asarray(q["cells"])
        p0 = np.asarray(
            src.read(spark)
            .filter(F.col("vec_id") == 0)
            .select("embedding")
            .collect()[0][0]
        )
        p0 = p0 / max(float(np.linalg.norm(p0)), 1e-12)
        cells = [
            int(c)
            for c in np.argsort(((p0[None, :] - cents) ** 2).sum(1))[
                : V.VI_NPROBE
            ]
        ]
        kept, total = idx.plan_files(isin=("cell", cells))
        out.append(
            {
                "sf": sf,
                "n_vectors": n,
                "build_sec": round(t_build, 2),
                "refresh_sec": round(t_refresh, 2),
                "query_sec": round(t_query, 2),
                "files_kept": len(kept),
                "files_total": total,
                "code_bytes_per_vec": V.VI_PQ_M,
                "raw_bytes_per_vec": 64 * 8,
                "n_query_rows": n_res,
            }
        )
        print(json.dumps(out[-1]))
    print(json.dumps({"probe": "vecindex", "results": out}))


if __name__ == "__main__":
    main()
