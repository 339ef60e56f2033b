"""Pins for the r12/r13 fast-path behaviors the optimization rounds rely
on (r12 verdict item: the optimization commits added no tests of their
own). Three Spark-version-sensitive assumptions get explicit guards:

  1. ``Observation`` metrics are POSTED by the job an eager
     ``localCheckpoint`` runs — the iterative graph ops (connected
     components, PageRank) read their convergence signature from that
     job instead of running a second aggregate per round. A Spark
     upgrade that stopped firing QueryExecutionListener success events
     for checkpoint materialization would otherwise surface as a HANG
     (Observation.get has no timeout), not a red test.
  2. ``tables.tiny_df`` is semantically identical to
     ``spark.createDataFrame`` (rows, order, schema application, null
     handling) and differs ONLY in parallelism: one slice.
  3. Manifest-supplied scan schemas equal the parquet footer schemas
     they replace (names + types), per ERA GROUP, on a table that has
     been evolved AND renamed — the assumption that lets every
     SnapshotTable read skip the footer-inference job (current era
     since r12, older eras since r13). This is the loud-failure guard
     the r12 advisor asked for: a writer emitting files that diverge
     from their commit's recorded schema breaks HERE, not silently at
     read time.
"""

from __future__ import annotations

import time

from pyspark.sql import Observation
from pyspark.sql import functions as F
from pyspark.sql import types as T


def test_observation_fires_on_eager_local_checkpoint_one_job(spark):
    sc = spark.sparkContext
    df = spark.range(0, 1000, 1, 4).select(
        F.col("id").alias("u"), (F.col("id") % 7).alias("v")
    )
    obs = Observation()
    group = f"pin-obs-{time.time_ns()}"
    sc.setJobGroup(group, group)
    try:
        ck = df.observe(
            obs,
            F.count(F.lit(1)).alias("n"),
            F.sum(F.xxhash64("u", "v").cast("decimal(38,0)")).alias("h"),
        ).localCheckpoint(eager=True)
        # the metrics must already be posted by the checkpoint's own
        # materialization job — obs.get would HANG here otherwise
        m = obs.get
    finally:
        sc.setJobGroup("", "")
    assert m["n"] == 1000
    assert m["h"] is not None
    jobs = sc.statusTracker().getJobIdsForGroup(group)
    assert len(jobs) == 1, (
        f"eager localCheckpoint + observe ran {len(jobs)} jobs; the "
        "iterative graph ops budget exactly one per round"
    )
    assert ck.count() == 1000  # the checkpoint itself is intact


def test_observation_fires_on_empty_frame_checkpoint(spark):
    # convergence rounds can present an EMPTY edge frame; the metric
    # must still post (ADVICE r12: this is the hang-risk case)
    obs = Observation()
    df = spark.range(0, 100, 1, 2).filter(F.col("id") < 0)
    ck = df.observe(obs, F.count(F.lit(1)).alias("n")).localCheckpoint(
        eager=True
    )
    assert obs.get["n"] == 0
    assert ck.count() == 0


def test_tiny_df_equals_create_dataframe_one_slice(spark):
    from iceberg_insert_spark.tables import tiny_df

    rows = [
        (1, "a", 1.5, None),
        (2, None, None, True),
        (None, "z", -0.0, False),
    ]
    schema = "k bigint, s string, x double, b boolean"
    a = spark.createDataFrame(rows, schema)
    b = tiny_df(spark, rows, schema)
    assert a.schema == b.schema
    assert a.collect() == b.collect()  # rows, order, nulls
    assert b.rdd.getNumPartitions() == 1
    # typed empty frame passes through createDataFrame unchanged
    e = tiny_df(spark, [], schema)
    assert e.schema == a.schema and e.count() == 0
    # StructType schemas apply identically too
    st = T.StructType(
        [
            T.StructField("k", T.LongType()),
            T.StructField("s", T.StringType()),
        ]
    )
    assert (
        tiny_df(spark, [(9, None)], st).collect()
        == spark.createDataFrame([(9, None)], st).collect()
    )


def test_manifest_schemas_match_footers_per_era(spark, tmp_path):
    from iceberg_insert_spark.sources.snapshots import SnapshotTable
    from iceberg_insert_spark.sources.snapshots.stats import (
        _schema_sans_metadata,
    )

    t = SnapshotTable(str(tmp_path / "eras"))
    t.append(
        spark.createDataFrame(
            [(1, "a", 10), (2, "b", 20)], "k long, s string, n int"
        )
    )
    # new era: widen n to long and add a defaulted column
    t.widen_column("n", T.LongType())
    t.add_column("tag", T.StringType(), default="fresh")
    t.append(
        spark.createDataFrame(
            [(3, "c", 30, "x")], "k long, s string, n long, tag string"
        )
    )
    # another era: rename a column, then append under the new name
    t.rename_column("s", "label")
    t.append(
        spark.createDataFrame(
            [(4, "d", 40, "y")],
            "k long, label string, n long, tag string",
        )
    )
    v = t._latest_published()
    meta = t._meta(v)
    eras = meta.get("file_schema_v", {})
    by_era: dict[int, list[str]] = {}
    for rel in meta["files"]:
        e = int(eras.get(rel, t._seq_of(rel)))
        by_era.setdefault(e, []).append(rel)
    assert len(by_era) >= 2, "fixture must span multiple schema eras"
    import os

    def names_types(st):
        return [(f.name, f.dataType) for f in st.fields]

    for era, rels in by_era.items():
        recorded = t._raw_meta(era).get("schema")
        assert recorded is not None
        rec_st = T.StructType.fromJson(_schema_sans_metadata(recorded))
        inferred = spark.read.parquet(
            *[os.path.join(t.path, r) for r in rels]
        ).schema
        assert names_types(rec_st) == names_types(inferred), (
            f"era {era}: manifest schema diverges from footers — the "
            "inference-free read would silently mask this"
        )
    # and the values read back correctly across the era groups
    got = {
        (r["k"], r["label"], r["n"], r["tag"])
        for r in t.read(spark).collect()
    }
    assert got == {
        (1, "a", 10, "fresh"),
        (2, "b", 20, "fresh"),
        (3, "c", 30, "x"),
        (4, "d", 40, "y"),
    }
