"""Console maintenance verbs (r11): EXPIRE / VACUUM next to COMPACT —
retention and orphan cleanup speakable as SQL, refused inside BEGIN
(they mutate table metadata immediately; an in-transaction EXPIRE
could reclaim the transaction's own staged snapshots)."""

from __future__ import annotations

import os
import time

import pytest
from pyspark.sql import functions as F

from iceberg_insert_spark.sources.catalog import LocalCatalog


def _mk(spark, tmp_path):
    cat = LocalCatalog(str(tmp_path))
    cat.create_namespace("db")
    t = cat.create_table("db.t")
    for i in range(4):
        t.append(
            spark.createDataFrame([(i,)], "k long").coalesce(1)
        )
    return cat, t


def test_expire_keep_last(spark, tmp_path):
    cat, t = _mk(spark, tmp_path)
    snaps = t.snapshots()
    out = cat.execute(spark, "EXPIRE {{db.t}} KEEP LAST 2")
    assert out["table"] == "db.t"
    assert out["kept_from"] == snaps[-2]
    assert t.snapshots() == snaps[-2:]
    # rows unaffected: expire is history retention, not data change
    assert cat.load_table("db.t").read(spark).count() == 4
    # n >= history: no-op (retain_last semantics)
    before = t.snapshots()
    out2 = cat.execute(spark, "EXPIRE {{db.t}} KEEP LAST 99")
    assert out2["deleted_files"] == 0
    assert t.snapshots() == before
    with pytest.raises(ValueError, match="KEEP LAST"):
        cat.execute(spark, "EXPIRE {{db.t}} KEEP LAST 0")
    with pytest.raises(ValueError, match="expected"):
        cat.execute(spark, "EXPIRE {{db.t}}")
    # created-but-never-committed table: clean no-op, not IndexError
    cat.create_table("db.empty")
    out3 = cat.execute(spark, "EXPIRE {{db.empty}} KEEP LAST 1")
    assert out3 == {
        "table": "db.empty",
        "deleted_files": 0,
        "kept_from": None,
    }


def test_expire_older_than_and_script_refusal(spark, tmp_path):
    cat, t = _mk(spark, tmp_path)
    # everything committed before 'now' expires except the latest
    out = cat.execute(
        spark, f"EXPIRE {{{{db.t}}}} OLDER THAN '{time.time() + 5}'"
    )
    assert out["table"] == "db.t"
    assert len(t.snapshots()) == 1
    with pytest.raises(ValueError, match="EXPIRE inside BEGIN"):
        cat.execute_script(
            spark,
            "BEGIN; EXPIRE {{db.t}} KEEP LAST 1; COMMIT",
        )
    with pytest.raises(ValueError, match="VACUUM inside BEGIN"):
        cat.execute_script(
            spark,
            "BEGIN; VACUUM {{db.t}}; COMMIT",
        )


def test_vacuum_reclaims_stale_staging(spark, tmp_path):
    cat, t = _mk(spark, tmp_path)
    # plant crash debris: a stale staging dir no manifest references
    debris = os.path.join(t.path, "_staging-deadbeef")
    os.makedirs(debris)
    with open(os.path.join(debris, "junk.parquet"), "w") as fh:
        fh.write("x")
    old = time.time() - 7200
    os.utime(debris, (old, old))
    os.utime(os.path.join(debris, "junk.parquet"), (old, old))
    out = cat.execute(spark, "VACUUM {{db.t}} GRACE 3600")
    assert out["removed"] >= 1
    assert not os.path.exists(debris)
    # fresh debris survives the default grace window
    fresh = os.path.join(t.path, "_staging-cafe")
    os.makedirs(fresh)
    out2 = cat.execute(spark, "VACUUM {{db.t}}")
    assert os.path.exists(fresh)
    assert out2["removed"] == 0
