"""LocalCatalog semantics: namespace rules, create/load/list, metadata-only
rename, drop with and without purge, properties, and lock contention."""

from __future__ import annotations

import os
from concurrent.futures import ThreadPoolExecutor

import pytest
from pyspark.sql import functions as F

from iceberg_insert_spark.sources.catalog import LocalCatalog

from .conftest import SF_DIR


def _orders(spark):
    return spark.read.parquet(f"{SF_DIR}/orders.parquet")


def test_namespace_rules(tmp_path):
    cat = LocalCatalog(str(tmp_path))
    cat.create_namespace("db")
    with pytest.raises(ValueError, match="already exists"):
        cat.create_namespace("db")
    with pytest.raises(ValueError, match="does not exist"):
        cat.create_table("nope.t")
    with pytest.raises(ValueError, match="invalid namespace"):
        cat.create_namespace("bad name")
    assert cat.list_namespaces() == ["db"]
    cat.drop_namespace("db")
    assert cat.list_namespaces() == []
    with pytest.raises(ValueError, match="does not exist"):
        cat.drop_namespace("db")


def test_create_load_list_and_kwargs_roundtrip(spark, tmp_path):
    cat = LocalCatalog(str(tmp_path))
    cat.create_namespace("db")
    t = cat.create_table("db.orders", stats_cols=["o_orderkey"])
    o = _orders(spark)
    t.append(o.limit(100))
    # load_table reconstructs the SAME table configuration
    t2 = cat.load_table("db.orders")
    assert t2.path == t.path
    assert t2.stats_cols == ["o_orderkey"]
    assert t2.read(spark).count() == 100
    assert cat.list_tables() == ["db.orders"]
    assert cat.list_tables("db") == ["db.orders"]
    assert cat.list_tables("other") == []
    assert cat.table_exists("db.orders")
    with pytest.raises(ValueError, match="already exists"):
        cat.create_table("db.orders")
    with pytest.raises(ValueError, match="must be"):
        cat.create_table("flat_name")


def test_rename_is_metadata_only(spark, tmp_path):
    cat = LocalCatalog(str(tmp_path))
    cat.create_namespace("raw")
    cat.create_namespace("curated")
    t = cat.create_table("raw.t")
    o = _orders(spark)
    t.append(o.filter(F.col("o_orderkey") % 2 == 0))
    v2 = t.append(o.filter(F.col("o_orderkey") % 2 == 1))
    loc_before = cat._entry("raw.t")["location"]
    cat.rename_table("raw.t", "curated.t")
    assert not cat.table_exists("raw.t")
    ent = cat._entry("curated.t")
    # the pointer moved; the data location and full history did not
    assert ent["location"] == loc_before
    t2 = cat.load_table("curated.t")
    assert t2.snapshots()[-1] == v2
    assert t2.read(spark).count() == o.count()
    # time travel across the rename still works
    assert t2.read(spark, as_of=t2.snapshots()[0]).count() == o.filter(
        F.col("o_orderkey") % 2 == 0
    ).count()
    with pytest.raises(ValueError, match="does not exist"):
        cat.rename_table("raw.t", "curated.other")
    cat.create_table("raw.t")  # old identifier is free again
    with pytest.raises(ValueError, match="already exists"):
        cat.rename_table("raw.t", "curated.t")


def test_drop_with_and_without_purge(spark, tmp_path):
    cat = LocalCatalog(str(tmp_path))
    cat.create_namespace("db")
    t = cat.create_table("db.keep_data")
    t.append(_orders(spark).limit(10))
    loc = cat._entry("db.keep_data")["location"]
    cat.drop_table("db.keep_data")
    assert not cat.table_exists("db.keep_data")
    assert os.path.isdir(loc)  # external-table drop keeps the files
    assert SnapshotTableLike(loc, spark).count() == 10

    t2 = cat.create_table("db.purge_me")
    t2.append(_orders(spark).limit(10))
    loc2 = cat._entry("db.purge_me")["location"]
    cat.drop_table("db.purge_me", purge=True)
    assert not os.path.exists(loc2)
    with pytest.raises(ValueError, match="does not exist"):
        cat.drop_table("db.purge_me")
    # a namespace holding tables refuses to drop
    cat.create_table("db.t")
    with pytest.raises(ValueError, match="not empty"):
        cat.drop_namespace("db")


def SnapshotTableLike(loc, spark):
    from iceberg_insert_spark.sources.snapshots import SnapshotTable

    return SnapshotTable(loc).read(spark)


def test_properties_update_remove(tmp_path):
    cat = LocalCatalog(str(tmp_path))
    cat.create_namespace("db")
    cat.create_table("db.t", properties={"owner": "etl"})
    assert cat.properties("db.t") == {"owner": "etl"}
    got = cat.update_properties(
        "db.t", updates={"retention": "7d"}, removes=["owner"]
    )
    assert got == {"retention": "7d"}
    assert cat.properties("db.t") == {"retention": "7d"}


def test_concurrent_creates_one_winner(tmp_path):
    """8 threads race to create the same identifier: exactly one wins,
    the rest get the clean already-exists error — the registry CAS."""
    cat = LocalCatalog(str(tmp_path))
    cat.create_namespace("db")

    def attempt(i):
        try:
            LocalCatalog(str(tmp_path)).create_table("db.raced")
            return "won"
        except ValueError as e:
            assert "already exists" in str(e)
            return "lost"

    with ThreadPoolExecutor(8) as ex:
        results = list(ex.map(attempt, range(8)))
    assert results.count("won") == 1
    assert cat.list_tables() == ["db.raced"]


def test_concurrent_distinct_creates_all_land(tmp_path):
    cat = LocalCatalog(str(tmp_path))
    cat.create_namespace("db")

    def create(i):
        LocalCatalog(str(tmp_path)).create_table(f"db.t{i}")

    with ThreadPoolExecutor(8) as ex:
        list(ex.map(create, range(8)))
    assert cat.list_tables() == [f"db.t{i}" for i in range(8)]


def test_catalog_verify_reports_each_bucket(spark, tmp_path):
    import shutil
    import time

    cat = LocalCatalog(str(tmp_path))
    cat.create_namespace("db")
    t = cat.create_table("db.healthy")
    t.append(_orders(spark).limit(5))
    assert cat.verify() == {
        "missing_locations": [],
        "unregistered_dirs": [],
        "shared_locations": [],
        "stale_lock": False,
        "failed_txns": [],
    }
    # missing location
    gone = cat.create_table("db.gone")
    gone.append(_orders(spark).limit(5))
    shutil.rmtree(cat._entry("db.gone")["location"])
    # unregistered dir (drop without purge leaves the data)
    keep = cat.create_table("db.kept_data")
    keep.append(_orders(spark).limit(5))
    cat.drop_table("db.kept_data")
    # shared location via explicit location=
    shared_loc = str(tmp_path / "db" / "healthy")
    cat.create_table("db.alias", location=shared_loc)
    # stale lock debris
    with open(cat._lock_path, "w") as fh:
        fh.write("dead-holder")
    old = time.time() - 60
    os.utime(cat._lock_path, (old, old))

    rep = cat.verify()
    assert rep["missing_locations"] == ["db.gone"]
    assert rep["unregistered_dirs"] == ["db/kept_data"]
    assert rep["shared_locations"] == [("db.alias", "db.healthy")]
    assert rep["stale_lock"] is True
    os.remove(cat._lock_path)


def test_sink_roundtrips_survive_adversarial_strings(spark, tmp_path):
    """Strings with delimiters, quotes, embedded newlines, unicode, and
    null-vs-empty must survive BOTH text sinks byte-exact. CSV needs
    multiLine for embedded newlines on read-back; JSONL escapes them."""
    rows = [
        (1, 'comma, inside'),
        (2, 'quote " inside'),
        (3, "new\nline"),
        (4, "tab\tand unicode ünïcødé ∑"),
        (5, ""),
        (6, None),
        (7, 'both, "and" \n all'),
    ]
    df = spark.createDataFrame(rows, "k long, s string")
    for fmt in ("csv", "json"):
        path = str(tmp_path / f"sink_{fmt}")
        if fmt == "csv":
            df.write.option("header", "true").csv(path)
            back = (
                spark.read.schema(df.schema)
                .option("header", "true")
                .option("multiLine", "true")
                .csv(path)
            )
        else:
            df.write.json(path)
            back = spark.read.schema(df.schema).json(path)
        got = {r.k: r.s for r in back.collect()}
        want = dict(rows)
        # CSV cannot distinguish null from empty string by default
        # (both write as nothing); JSONL preserves the distinction
        if fmt == "csv":
            want = {k: (None if v == "" else v) for k, v in want.items()}
        assert got == want, fmt


def test_views_versioned_create_replace_pin_drop(spark, tmp_path):
    cat = LocalCatalog(str(tmp_path))
    cat.create_namespace("db")
    t = cat.create_table("db.t")
    o = _orders(spark)
    t.append(o.limit(100))
    v = cat.create_view(
        "db.top", "SELECT o_orderkey FROM {{db.t}} WHERE o_orderkey < 50"
    )
    assert v == 1
    n1 = cat.read_view(spark, "db.top").count()
    assert n1 == o.limit(100).filter(F.col("o_orderkey") < 50).count()
    with pytest.raises(ValueError, match="already exists"):
        cat.create_view("db.top", "SELECT 1 FROM {{db.t}}")
    v2 = cat.create_view(
        "db.top",
        "SELECT o_orderkey FROM {{db.t}} WHERE o_orderkey < 10",
        replace=True,
    )
    assert v2 == 2 and cat.view_versions("db.top") == 2
    assert cat.read_view(spark, "db.top").count() == o.limit(100).filter(
        F.col("o_orderkey") < 10
    ).count()
    # the pinned old definition stays readable
    assert cat.read_view(spark, "db.top", version=1).count() == n1
    with pytest.raises(ValueError, match="versions 1..2"):
        cat.read_view(spark, "db.top", version=3)
    # views resolve against the tables' CURRENT state
    t.append(o.limit(100))
    assert (
        cat.read_view(spark, "db.top", version=1).count() == 2 * n1
    )
    assert cat.view_dependencies("db.top") == ["db.t"]
    assert cat.list_views() == ["db.top"]
    cat.drop_view("db.top")
    with pytest.raises(ValueError, match="does not exist"):
        cat.read_view(spark, "db.top")


def test_views_share_identifier_space_and_block_namespace_drop(
    spark, tmp_path
):
    cat = LocalCatalog(str(tmp_path))
    cat.create_namespace("db")
    cat.create_namespace("other")
    cat.create_table("db.t")
    with pytest.raises(ValueError, match="is a table"):
        cat.create_view("db.t", "SELECT 1 FROM {{db.t}}")
    cat.create_view("db.v", "SELECT 1 AS one FROM {{db.t}}")
    with pytest.raises(ValueError, match="is a view"):
        cat.create_table("db.v")
    with pytest.raises(ValueError, match="already exists"):
        cat.rename_table("db.t", "db.v")
    with pytest.raises(ValueError, match="not empty"):
        cat.drop_namespace("db")
    with pytest.raises(ValueError, match="no .* placeholder"):
        cat.create_view("db.w", "SELECT 1")
    with pytest.raises(ValueError, match="must be"):
        cat.create_view("db.w", "SELECT 1 FROM {{bad..ref}}")


def test_materialized_view_lifecycle(spark, tmp_path):
    cat = LocalCatalog(str(tmp_path))
    cat.create_namespace("db")
    t = cat.create_table("db.src")
    o = _orders(spark)
    t.append(o.limit(100))
    cat.create_materialized_view(
        "db.mv",
        "SELECT COUNT(*) AS n FROM {{db.src}}",
    )
    # never refreshed -> stale -> falls back to live SQL
    assert cat.is_stale("db.mv")
    df, from_storage = cat.read_materialized(spark, "db.mv")
    assert not from_storage and df.collect()[0]["n"] == 100
    cat.refresh_materialized(spark, "db.mv")
    assert not cat.is_stale("db.mv")
    df, from_storage = cat.read_materialized(spark, "db.mv")
    assert from_storage and df.collect()[0]["n"] == 100
    # source advances -> stale -> live fallback sees the new rows
    t.append(o.limit(50))
    assert cat.is_stale("db.mv")
    df, from_storage = cat.read_materialized(spark, "db.mv")
    assert not from_storage and df.collect()[0]["n"] == 150
    # re-refresh serves current data from storage
    cat.refresh_materialized(spark, "db.mv")
    df, from_storage = cat.read_materialized(spark, "db.mv")
    assert from_storage and df.collect()[0]["n"] == 150
    # replacing the DEFINITION invalidates freshness
    cat.create_materialized_view(
        "db.mv",
        "SELECT COUNT(*) AS n FROM {{db.src}} WHERE o_orderkey < 10",
        replace=True,
    )
    assert cat.is_stale("db.mv")
    df, from_storage = cat.read_materialized(spark, "db.mv")
    assert not from_storage
    # plain views refuse the MV-only APIs
    cat.create_view("db.plain", "SELECT 1 AS one FROM {{db.src}}")
    with pytest.raises(ValueError, match="not materialized"):
        cat.is_stale("db.plain")
    # the storage table is a first-class catalog table
    assert "db.mv__storage" in cat.list_tables("db")


def test_review_fixes_views_mv_defaults(spark, tmp_path):
    """Review regressions: injective temp-view names, MV storage
    adoption refusal, version-validated dependencies, drop_view purges
    MV storage, refresh pins the definition version it computed."""
    from pyspark.sql import types as T

    cat = LocalCatalog(str(tmp_path))
    cat.create_namespace("raw")
    cat.create_namespace("raw__x")
    o = _orders(spark)
    # identifiers that collide under a naive '.'->'__' mapping
    a = cat.create_table("raw.x__y")
    a.append(o.limit(10))
    b = cat.create_table("raw__x.y")
    b.append(o.limit(20))
    cat.create_view(
        "raw.both",
        "SELECT (SELECT COUNT(*) FROM {{raw.x__y}}) AS na, "
        "(SELECT COUNT(*) FROM {{raw__x.y}}) AS nb FROM {{raw.x__y}} "
        "LIMIT 1",
    )
    r = cat.read_view(spark, "raw.both").collect()[0]
    assert (r.na, r.nb) == (10, 20)
    # version validation is shared by deps and read
    with pytest.raises(ValueError, match="versions 1..1"):
        cat.view_dependencies("raw.both", version=0)
    # MV refuses to adopt a user table carrying the storage name
    cat.create_table("raw.sales__storage").append(o.limit(5))
    with pytest.raises(ValueError, match="refusing to adopt"):
        cat.create_materialized_view(
            "raw.sales", "SELECT COUNT(*) AS n FROM {{raw.x__y}}"
        )
    # drop_view purges an MV's storage table
    cat.create_materialized_view(
        "raw.mv", "SELECT COUNT(*) AS n FROM {{raw.x__y}}"
    )
    cat.refresh_materialized(spark, "raw.mv")
    loc = cat._entry("raw.mv__storage")["location"]
    cat.drop_view("raw.mv")
    assert not cat.table_exists("raw.mv__storage")
    assert not os.path.exists(loc)


def test_default_validation_and_widen_preserves_metadata(spark, tmp_path):
    from pyspark.sql import types as T

    from iceberg_insert_spark.sources.snapshots import SnapshotTable

    tbl = SnapshotTable(str(tmp_path / "t"))
    df = spark.createDataFrame([(1, 1.5)], "k int, x float")
    tbl.append(df)
    with pytest.raises(ValueError, match="not a long value"):
        tbl.add_column("n", T.LongType(), default="oops")
    with pytest.raises(ValueError, match="not a boolean"):
        tbl.add_column("f", T.BooleanType(), default=1)
    with pytest.raises(ValueError, match="scalar column types"):
        tbl.add_column("arr", T.ArrayType(T.LongType()), default="x")
    tbl.add_column("region", T.StringType(), default="eu")
    # widen of ANOTHER column must not erase the default metadata
    tbl.widen_column("x", T.DoubleType())
    tbl.append(spark.createDataFrame([(2, 2.5)], "k int, x float"))
    got = {r.k: r.region for r in tbl.read(spark).collect()}
    assert got == {1: "eu", 2: "eu"}
    # compaction (replace commit) keeps the write-default too
    tbl.compact(spark)
    tbl.append(spark.createDataFrame([(3, 3.5)], "k int, x double"))
    got = {r.k: r.region for r in tbl.read(spark).collect()}
    assert got == {1: "eu", 2: "eu", 3: "eu"}


def test_sql_front_end_tables_views_and_pins(spark, tmp_path):
    """cat.sql(): {{ns.table}} reads the current snapshot, {{ns.view}}
    inlines recursively (view-on-view), {{ns.table@N}} pins a
    snapshot — all inside ONE statement."""
    cat = LocalCatalog(str(tmp_path))
    cat.create_namespace("db")
    t = cat.create_table("db.t")
    v1 = t.append(spark.createDataFrame([(1, 10), (2, 20)], "k int, x int"))
    t.append(spark.createDataFrame([(3, 30)], "k int, x int"))
    cat.create_view("db.doubled", "SELECT k, x * 2 AS x2 FROM {{db.t}}")
    # view-on-view: filters through two inline layers
    cat.create_view(
        "db.big", "SELECT k, x2 FROM {{db.doubled}} WHERE x2 >= 40"
    )
    out = cat.sql(
        spark,
        f"""
        SELECT (SELECT COUNT(*) FROM {{{{db.t@{v1}}}}}) AS pinned,
               (SELECT COUNT(*) FROM {{{{db.t}}}}) AS current,
               SUM(x2) AS s FROM {{{{db.big}}}}
        """,
    ).collect()[0]
    assert (out.pinned, out.current, out.s) == (2, 3, 100)


def test_sql_front_end_refusals(spark, tmp_path):
    cat = LocalCatalog(str(tmp_path))
    cat.create_namespace("db")
    cat.create_table("db.t").append(
        spark.createDataFrame([(1,)], "k int")
    )
    cat.create_view("db.v", "SELECT * FROM {{db.t}}")
    with pytest.raises(ValueError, match="apply to tables"):
        cat.sql(spark, "SELECT * FROM {{db.v@1}}")
    with pytest.raises(ValueError, match="does not exist"):
        cat.sql(spark, "SELECT * FROM {{db.ghost}}")
    # a view cycle (created by replacing with a self-reference) refuses
    cat.create_view("db.v", "SELECT * FROM {{db.v}}", replace=True)
    with pytest.raises(ValueError, match="circular"):
        cat.sql(spark, "SELECT * FROM {{db.v}}")


def test_sql_front_end_materialized_and_deps(spark, tmp_path):
    """An MV resolves inside sql() (fresh -> storage); MV-over-view
    freshness walks to the underlying tables."""
    cat = LocalCatalog(str(tmp_path))
    cat.create_namespace("db")
    t = cat.create_table("db.t")
    t.append(spark.createDataFrame([(1, 5), (2, 6)], "k int, x int"))
    cat.create_view("db.v", "SELECT k, x + 1 AS x1 FROM {{db.t}}")
    cat.create_materialized_view(
        "db.mv", "SELECT SUM(x1) AS s FROM {{db.v}}"
    )
    cat.refresh_materialized(spark, "db.mv")
    assert not cat.is_stale("db.mv")
    assert cat.sql(spark, "SELECT s FROM {{db.mv}}").collect()[0].s == 13
    # a commit to the UNDERLYING table (behind the view) flags staleness
    t.append(spark.createDataFrame([(3, 7)], "k int, x int"))
    assert cat.is_stale("db.mv")
    # ... and sql() serves the live fallback, never the stale storage
    assert cat.sql(spark, "SELECT s FROM {{db.mv}}").collect()[0].s == 21


def test_sql_insert_and_ctas(spark, tmp_path):
    """The write half of the SQL front-end: INSERT INTO appends one
    atomic snapshot through the table's own commit rules; CTAS creates
    and populates all-or-nothing."""
    cat = LocalCatalog(str(tmp_path))
    cat.create_namespace("db")
    t = cat.create_table("db.t")
    t.append(spark.createDataFrame([(1, 10.0), (2, 20.0)], "k int, v double"))
    cat.create_view("db.big", "SELECT k, v FROM {{db.t}} WHERE v >= 20")
    # CTAS from a view
    t2 = cat.create_table_as(
        spark, "db.derived", "SELECT k, v * 2 AS v2 FROM {{db.big}}"
    )
    assert [(r.k, r.v2) for r in t2.read(spark).collect()] == [(2, 40.0)]
    # INSERT INTO reading the source table and a pin
    v = cat.sql_insert(
        spark,
        "INSERT INTO {{db.derived}} SELECT k, v AS v2 FROM {{db.t}} "
        "WHERE k = 1",
    )
    got = sorted((r.k, r.v2) for r in t2.read(spark).collect())
    assert got == [(1, 10.0), (2, 40.0)] and v == 2
    # refusals: inserting into a view; malformed statement; failed CTAS
    # leaves no table behind
    with pytest.raises(ValueError, match="INSERT INTO view"):
        cat.sql_insert(spark, "INSERT INTO {{db.big}} SELECT 1 AS k")
    with pytest.raises(ValueError, match="expected"):
        cat.sql_insert(spark, "UPSERT {{db.t}}")
    with pytest.raises(Exception):
        cat.create_table_as(spark, "db.broken", "SELECT * FROM {{db.ghost}}")
    assert not cat.table_exists("db.broken")


def test_rtas_atomic_replace(spark, tmp_path):
    """RTAS: same table identity, new schema + contents in ONE snapshot;
    history crosses the replace (pre-replace pin readable, old schema);
    a failed RTAS compute leaves the head untouched; views refused;
    missing tables get the clean error."""
    cat = LocalCatalog(str(tmp_path / "cat"))
    cat.create_namespace("db")
    t = cat.create_table("db.t")
    t.append(spark.createDataFrame([(1, "a"), (2, "b")], "k int, s string"))
    v1 = t.snapshots()[-1]
    v2 = cat.replace_table_as(
        spark, "db.t", "SELECT k * 10 AS k10 FROM {{db.t}}"
    )
    live = cat.load_table("db.t").read(spark)
    assert live.columns == ["k10"]
    assert sorted(r.k10 for r in live.collect()) == [10, 20]
    old = cat.load_table("db.t").read(spark, as_of=v1)
    assert old.columns == ["k", "s"]
    assert sorted((r.k, r.s) for r in old.collect()) == [(1, "a"), (2, "b")]
    # failed compute: head stays at v2
    with pytest.raises(Exception):
        cat.replace_table_as(spark, "db.t", "SELECT * FROM {{db.ghost}}")
    assert cat.load_table("db.t").snapshots()[-1] == v2
    assert sorted(
        r.k10 for r in cat.load_table("db.t").read(spark).collect()
    ) == [10, 20]
    # refusals
    cat.create_view("db.v", "SELECT k10 FROM {{db.t}}")
    with pytest.raises(ValueError, match="REPLACE view"):
        cat.replace_table_as(spark, "db.v", "SELECT 1 AS x")
    with pytest.raises(ValueError, match="does not exist"):
        cat.replace_table_as(spark, "db.missing", "SELECT 1 AS x")


def test_rtas_clears_check_constraints(spark, tmp_path):
    """RTAS on a constrained table succeeds with a new shape and CLEARS
    the constraints (CREATE OR REPLACE semantics); a direct overwrite
    with an incompatible shape on a still-constrained table gets the
    clean CHECK error, not an unresolved-column crash."""
    from iceberg_insert_spark.sources.snapshots import SnapshotTable

    cat = LocalCatalog(str(tmp_path / "cat"))
    cat.create_namespace("db")
    loc = str(tmp_path / "cat" / "db" / "t")
    cat.create_table("db.t", location=loc)
    t = SnapshotTable(loc, constraints={"pos": "v > 0"})
    t.append(spark.createDataFrame([(1, 2.0)], "k int, v double"))
    # direct overwrite with a shape missing `v`: clean refusal
    with pytest.raises(ValueError, match="CHECK constraints"):
        t.overwrite(spark.createDataFrame([(5,)], "k2 int"))
    # RTAS swaps the shape and clears the property
    cat.replace_table_as(spark, "db.t", "SELECT k * 2 AS k2 FROM {{db.t}}")
    re = cat.load_table("db.t")
    assert "constraints" not in re._meta(re._latest_published())
    assert [r.k2 for r in re.read(spark).collect()] == [2]
    re.append(spark.createDataFrame([(-1,)], "k2 int"))  # no guard now


def test_sql_front_end_timestamp_pins(spark, tmp_path):
    """{{ns.t@ts:...}}: TIMESTAMP AS OF through the front-end — epoch
    seconds and ISO-8601 (naive = UTC) both resolve to the newest
    snapshot at-or-before the instant; a ts pin on a view is refused;
    an instant before the first commit errors cleanly."""
    import datetime
    import time

    cat = LocalCatalog(str(tmp_path / "cat"))
    cat.create_namespace("db")
    t = cat.create_table("db.t")
    t.append(spark.createDataFrame([(1,)], "k int"))
    ts1 = t._meta(t.snapshots()[-1])["ts"]
    time.sleep(0.02)
    t.append(spark.createDataFrame([(2,)], "k int"))
    mid = (ts1 + t._meta(t.snapshots()[-1])["ts"]) / 2
    n = cat.sql(
        spark, f"SELECT COUNT(*) AS n FROM {{{{db.t@ts:{mid}}}}}"
    ).collect()[0].n
    assert n == 1
    iso = (
        datetime.datetime.fromtimestamp(mid, tz=datetime.timezone.utc)
        .replace(tzinfo=None)
        .isoformat()
    )
    n = cat.sql(
        spark, f"SELECT COUNT(*) AS n FROM {{{{db.t@ts:{iso}}}}}"
    ).collect()[0].n
    assert n == 1
    n = cat.sql(
        spark, f"SELECT COUNT(*) AS n FROM {{{{db.t@ts:{time.time()}}}}}"
    ).collect()[0].n
    assert n == 2
    cat.create_view("db.v", "SELECT k FROM {{db.t}}")
    with pytest.raises(ValueError, match="apply"):
        cat.sql(spark, f"SELECT * FROM {{{{db.v@ts:{mid}}}}}")
    with pytest.raises(ValueError, match="no snapshot at or before"):
        cat.sql(
            spark,
            f"SELECT * FROM {{{{db.t@ts:{ts1 - 1000}}}}}",
        )


def test_sql_dml_verbs_and_refusals(spark, tmp_path):
    """DELETE/UPDATE/INSERT OVERWRITE through the front-end: routed to
    the table's own commit machinery; paren/quote-aware SET parsing;
    views refused; malformed statements get the grammar error; execute()
    dispatches reads vs writes."""
    cat = LocalCatalog(str(tmp_path))
    cat.create_namespace("db")
    t = cat.create_table("db.t")
    t.append(
        spark.createDataFrame(
            [(1, 10.0, "a"), (2, 20.0, "b"), (3, 30.0, "a,b")],
            "k int, v double, s string",
        )
    )
    cat.execute(spark, "DELETE FROM {{db.t}} WHERE k = 2")
    # SET exprs with top-level-comma hazards: function args + a quoted
    # comma in a literal comparison
    cat.execute(
        spark,
        "UPDATE {{db.t}} SET v = round(v + 0.5, 1), "
        "s = CASE WHEN s = 'a,b' THEN 'both' ELSE s END WHERE k >= 1",
    )
    got = sorted(
        (r.k, r.v, r.s)
        for r in cat.sql(spark, "SELECT * FROM {{db.t}}").collect()
    )
    assert got == [(1, 10.5, "a"), (3, 30.5, "both")]
    v = cat.execute(
        spark, "INSERT OVERWRITE {{db.t}} SELECT k * 100 AS k2 FROM {{db.t}}"
    )
    assert isinstance(v, int)
    assert sorted(
        r.k2 for r in cat.sql(spark, "SELECT * FROM {{db.t}}").collect()
    ) == [100, 300]
    cat.create_view("db.w", "SELECT k2 FROM {{db.t}}")
    for stmt, msg in [
        ("DELETE FROM {{db.w}} WHERE k2 = 1", "view"),
        ("UPDATE {{db.w}} SET k2 = 1 WHERE k2 = 1", "view"),
        ("INSERT OVERWRITE {{db.w}} SELECT 1 AS x", "view"),
    ]:
        with pytest.raises(ValueError, match=msg):
            cat.execute(spark, stmt)
    with pytest.raises(ValueError, match="expected"):
        cat.sql_delete(spark, "DELETE FROM {{db.t}}")  # no WHERE
    with pytest.raises(ValueError, match="malformed SET"):
        cat.sql_update(spark, "UPDATE {{db.t}} SET v WHERE k = 1")
    with pytest.raises(ValueError, match="assigned twice"):
        cat.sql_update(
            spark, "UPDATE {{db.t}} SET k2 = 1, k2 = 2 WHERE k2 = 1"
        )


def test_catalog_handles_do_not_revert_constraint_ddl(spark, tmp_path):
    """A table created THROUGH the catalog with constraints must honor
    later add_constraint from any handle: the registry does not replay
    creation-time constraints (they live in manifests), so a fresh
    load_table enforces the evolved set instead of silently reverting
    it (review catch)."""
    cat = LocalCatalog(str(tmp_path))
    cat.create_namespace("db")
    t = cat.create_table("db.t", constraints={"pos": "v > 0"})
    t.append(spark.createDataFrame([(1, 5.0)], "k int, v double"))
    cat.load_table("db.t").add_constraint(spark, "cap", "v < 100")
    with pytest.raises(Exception, match="CHECK constraint"):
        cat.sql_insert(
            spark, "INSERT INTO {{db.t}} SELECT 2 AS k, 500.0 AS v"
        )
    live = cat.load_table("db.t")
    assert set(
        live._meta(live._latest_published()).get("constraints", {})
    ) == {"pos", "cap"}
    # the creation-time constraint still enforces too
    with pytest.raises(Exception, match="CHECK constraint"):
        cat.sql_insert(
            spark, "INSERT INTO {{db.t}} SELECT 3 AS k, -1.0 AS v"
        )


def test_sql_dml_quoted_where_and_near_miss_grammar(spark, tmp_path):
    """Review catches: a SET expression containing 'where' inside a
    string literal must not split the statement mid-literal, and
    near-miss DML through execute() gets the verb's grammar error, not
    a Spark temp-view crash; ts pins accept space-separated ISO."""
    import time

    cat = LocalCatalog(str(tmp_path))
    cat.create_namespace("db")
    t = cat.create_table("db.t")
    t.append(spark.createDataFrame([(1, "x")], "k int, note string"))
    cat.execute(
        spark,
        "UPDATE {{db.t}} SET note = 'as where is' WHERE k = 1",
    )
    assert [
        r.note for r in cat.sql(spark, "SELECT note FROM {{db.t}}").collect()
    ] == ["as where is"]
    # backslash-escaped quote inside the literal (advisor catch, r6):
    # without escape handling the scanner closes the quote at \' and
    # splits on the WHERE inside the literal
    cat.execute(
        spark,
        r"UPDATE {{db.t}} SET note = 'it\'s where it is' WHERE k = 1",
    )
    assert [
        r.note for r in cat.sql(spark, "SELECT note FROM {{db.t}}").collect()
    ] == ["it's where it is"]
    with pytest.raises(ValueError, match="expected 'DELETE"):
        cat.execute(spark, "DELETE FROM {{db.t}}")
    with pytest.raises(ValueError, match="expected 'UPDATE"):
        cat.execute(spark, "UPDATE {{db.t}} SET note = 'x'")
    with pytest.raises(ValueError, match="expected 'INSERT OVERWRITE"):
        cat.execute(spark, "INSERT OVERWRITE {{db.t}}")
    # space-separated ISO ts pin resolves instead of leaking '{{'
    import datetime

    iso = (
        datetime.datetime.fromtimestamp(
            time.time() + 1, tz=datetime.timezone.utc
        )
        .replace(tzinfo=None)
        .isoformat(sep=" ", timespec="seconds")
    )
    n = cat.sql(
        spark, f"SELECT COUNT(*) AS n FROM {{{{db.t@ts:{iso}}}}}"
    ).collect()[0].n
    assert n == 1


def test_catalog_shallow_clone(spark, tmp_path):
    """clone_table: registers the clone under catalog rules (identifier
    reserved first, all-or-nothing on failure), re-homes files zero-copy,
    and the two tables diverge independently through catalog handles."""
    cat = LocalCatalog(str(tmp_path))
    cat.create_namespace("db")
    t = cat.create_table("db.src", stats_cols=["v"])
    t.append(spark.createDataFrame([(1, 5.0), (2, 9.0)], "k int, v double"))
    c = cat.clone_table("db.src", "db.copy")
    assert sorted(r.k for r in c.read(spark).collect()) == [1, 2]
    # registry entry exists and carries kwargs (stats work on the clone)
    assert cat.load_table("db.copy").min_max(spark, "v") == (5.0, 9.0, True)
    cat.load_table("db.copy").append(
        spark.createDataFrame([(3, 1.0)], "k int, v double")
    )
    assert cat.load_table("db.src").read(spark).count() == 2
    assert cat.load_table("db.copy").read(spark).count() == 3
    # refusals: existing identifier; failed clone leaves no entry behind
    with pytest.raises(ValueError, match="already exists"):
        cat.clone_table("db.src", "db.copy")
    m = cat.create_table("db.mor")
    m.append(spark.createDataFrame([(1, 1.0)], "k int, v double"))
    m.delete_where(spark, "k = 1", strategy="mor")
    with pytest.raises(ValueError, match="delete files"):
        cat.clone_table("db.mor", "db.mor2")
    assert not cat.table_exists("db.mor2")


def test_clone_table_never_destroys_preserved_data(spark, tmp_path):
    """Review catch (reproduced live pre-fix): a non-purge drop preserves
    its data files at the default location; a later clone_table onto the
    same identifier must REFUSE cleanly — and must not purge the
    preserved tree in its failure cleanup."""
    cat = LocalCatalog(str(tmp_path))
    cat.create_namespace("db")
    src = cat.create_table("db.src")
    src.append(spark.createDataFrame([(1,)], "k int"))
    old = cat.create_table("db.keep")
    old.append(spark.createDataFrame([(42,)], "k int"))
    old_loc = old.path
    cat.drop_table("db.keep", purge=False)  # contract: files preserved
    with pytest.raises(ValueError, match="not empty"):
        cat.clone_table("db.src", "db.keep")
    # the preserved table's bytes are intact and the identifier is free
    assert not cat.table_exists("db.keep")
    from iceberg_insert_spark.sources.snapshots import SnapshotTable

    assert [r.k for r in SnapshotTable(old_loc).read(spark).collect()] == [42]


def test_analyze_table_backfill_grammar_and_idempotence(spark, tmp_path):
    """ANALYZE: backfills sidecars for an un-maintained table (point
    bloom pruning included with WITH BLOOM), persists the column sets
    for future handles, re-analyzing is a zero-file no-op, and grammar
    near-misses get the verb's clean error."""
    cat = LocalCatalog(str(tmp_path))
    cat.create_namespace("db")
    t = cat.create_table("db.t")
    t.append(
        spark.createDataFrame(
            [(i, float(i)) for i in range(100)], "k long, v double"
        ).coalesce(1)
    )
    t.append(
        spark.createDataFrame(
            [(i, float(i)) for i in range(100, 200)], "k long, v double"
        ).coalesce(1)
    )
    # un-analyzed: all metadata paths fall back
    h0 = cat.load_table("db.t")
    assert h0.min_max(spark, "v")[2] is False
    rep = cat.execute(
        spark,
        "ANALYZE TABLE {{db.t}} COMPUTE STATISTICS FOR COLUMNS k, v"
        " WITH BLOOM",
    )
    assert rep["files_analyzed"] == 2
    h1 = cat.load_table("db.t")
    assert h1.min_max(spark, "v") == (0.0, 199.0, True)
    assert h1.count_rows(spark) == (200, 2)
    est, meta = h1.ndv(spark, "k")
    assert meta is True and abs(est - 200) <= 10
    # bloom: a point probe prunes to the one file holding the key
    plan, _ = h1.plan_files(eq=("k", 150))
    assert len(plan) == 1
    # idempotent: nothing left to backfill
    assert cat.analyze_table("db.t", ["k", "v"], blooms=True) == {
        "files_analyzed": 0
    }
    # a fresh handle keeps recording on its own appends
    h2 = cat.load_table("db.t")
    h2.append(
        spark.createDataFrame([(500, 500.0)], "k long, v double")
    )
    assert h2.min_max(spark, "v") == (0.0, 500.0, True)
    with pytest.raises(ValueError, match="expected 'ANALYZE"):
        cat.execute(spark, "ANALYZE TABLE {{db.t}} COMPUTE STATISTICS")


def test_describe_and_show_tables_verbs(spark, tmp_path):
    """DESCRIBE [TABLE] [EXTENDED] and SHOW TABLES [IN ns] — the
    console's metadata verbs: era-resolved schema rows, the metadata
    section (constraints, maintained columns, delete-file kinds,
    properties), view/MV kinds in the listing, and clean grammar
    errors. Zero data IO: both answer from registry + manifests."""
    cat = LocalCatalog(str(tmp_path))
    cat.create_namespace("db")
    cat.create_namespace("other")
    t = cat.create_table(
        "db.t",
        stats_cols=["k"],
        ndv_cols=["k"],
        properties={"owner": "etl"},
    )
    t.append(
        spark.createDataFrame([(1, 2.0)], "k long, v double")
    )
    t.add_constraint(spark, "pos", "v > 0")
    t.rename_column("v", "val")
    t.delete_where(spark, "k = 99", strategy="mor")  # no-op, no files
    cat.create_table("other.t2")
    cat.create_view("db.v", "SELECT k FROM {{db.t}}")
    rows = cat.execute(spark, "DESCRIBE {{db.t}}").collect()
    by = {r.col_name: r for r in rows}
    assert by["k"].data_type == "long"
    assert by["val"].data_type == "double"  # renamed form shows
    assert "v" not in by
    assert "pos: v > 0" in by["constraints"].info
    assert by["stats_cols"].info == "k"
    assert by["ndv_cols"].info == "k"
    assert by["properties"].info == "owner=etl"
    assert by["n_snapshots"].info == "3"  # append + constraint + rename
    listing = {
        (r.identifier, r.kind)
        for r in cat.execute(spark, "SHOW TABLES").collect()
    }
    assert listing == {
        ("db.t", "table"),
        ("other.t2", "table"),
        ("db.v", "view"),
    }
    only_db = {
        r.identifier
        for r in cat.execute(spark, "SHOW TABLES IN db").collect()
    }
    assert only_db == {"db.t", "db.v"}
    with pytest.raises(ValueError, match="expected 'DESCRIBE"):
        cat.execute(spark, "DESCRIBE db.t")
    with pytest.raises(ValueError, match="expected 'SHOW"):
        cat.execute(spark, "SHOW NAMESPACES")


def test_explain_verb_pruned_read_and_broadcast_join(spark, tmp_path):
    """EXPLAIN through execute() (r7 verdict #7): a stats-column range
    probe must show the METADATA PLANNER's files-kept/total verdict
    (3 sorted-disjoint files -> 1 kept), the physical plan's join
    strategy row must name BroadcastHashJoin for a small dim join, and
    filter pushdown / column pruning must appear from the FileScan.
    Grammar near-misses and write verbs get clean errors."""
    cat = LocalCatalog(str(tmp_path))
    cat.create_namespace("db")
    t = cat.create_table("db.fact", stats_cols=["k"])
    # three appends with DISJOINT k ranges: file-level stats prune 2/3
    for lo in (0, 100, 200):
        t.append(
            spark.createDataFrame(
                [(lo + i, float(i)) for i in range(50)],
                "k long, v double",
            ).coalesce(1)
        )
    d = cat.create_table("db.dim")
    d.append(
        spark.createDataFrame(
            [(i, f"g{i % 3}") for i in range(0, 300, 10)],
            "k long, grp string",
        )
    )
    rows = cat.execute(
        spark,
        "EXPLAIN SELECT f.k, f.v, d.grp FROM {{db.fact}} f "
        "JOIN {{db.dim}} d ON f.k = d.k "
        "WHERE f.k BETWEEN 120 AND 160",
    ).collect()
    by_kind: dict = {}
    for r in rows:
        by_kind.setdefault(r.kind, []).append(r.item)
    # metadata planner: only the middle file survives the range
    assert any(
        "db.fact@3.k BETWEEN 120 AND 160: files 1/3" in it
        for it in by_kind["pruning"]
    )
    # table rows: resolved snapshot + file/manifest counts
    assert any(it.startswith("db.fact@3: files=3") for it in by_kind["table"])
    assert any(it.startswith("db.dim@") for it in by_kind["table"])
    # join strategy: the tiny dim must broadcast
    assert any("BroadcastHashJoin" in it for it in by_kind["join"])
    # scan rows: the range predicate reached the parquet reader and
    # column pruning dropped nothing it needs / kept nothing it doesn't
    assert any(
        "GreaterThanOrEqual(k,120)" in it
        for it in by_kind["pushed_filters"]
    )
    assert any("struct<k:bigint,v:double>" in it for it in by_kind["read_schema"])
    # alias attribution (review catch): a conjunct qualified to the
    # fact alias must NOT claim pruning on dim, even if dim recorded a
    # same-named stats column
    cat.analyze_table("db.dim", ["k"])
    rows2 = cat.execute(
        spark,
        "EXPLAIN SELECT f.k FROM {{db.fact}} f JOIN {{db.dim}} d "
        "ON f.k = d.k WHERE f.k BETWEEN 120 AND 160",
    ).collect()
    prunes = [r.item for r in rows2 if r.kind == "pruning"]
    assert any(it.startswith("db.fact@") for it in prunes)
    assert not any(it.startswith("db.dim@") for it in prunes)
    # OR context (review catch): a BETWEEN under OR does not prune —
    # no pruning rows at all
    rows3 = cat.execute(
        spark,
        "EXPLAIN SELECT k FROM {{db.fact}} "
        "WHERE k BETWEEN 120 AND 160 OR v > 1e9",
    ).collect()
    assert not [r for r in rows3 if r.kind == "pruning"]
    # snapshot pins get their OWN table rows (review catch: bare-name
    # dedup dropped the pinned side of a time-travel diff)
    rows4 = cat.execute(
        spark,
        "EXPLAIN SELECT a.k FROM {{db.fact}} a JOIN {{db.fact@1}} b "
        "ON a.k = b.k",
    ).collect()
    tables4 = [r.item for r in rows4 if r.kind == "table"]
    assert any(it.startswith("db.fact@3:") for it in tables4)
    assert any(it.startswith("db.fact@1: files=1") for it in tables4)
    # near-miss grammar
    with pytest.raises(ValueError, match="EXPLAIN <statement>"):
        cat.execute(spark, "EXPLAIN")
    with pytest.raises(ValueError, match="read statements"):
        cat.execute(spark, "EXPLAIN DELETE FROM {{db.fact}} WHERE k = 1")


def test_show_create_table_verb(spark, tmp_path):
    """SHOW CREATE TABLE reconstructs the CURRENT definition — era-
    resolved schema (a renamed column shows its live name), partition
    spec, maintained columns, constraints, properties — from registry
    + one manifest read; views refused; grammar near-miss errors."""
    cat = LocalCatalog(str(tmp_path))
    cat.create_namespace("db")
    t = cat.create_table(
        "db.t",
        stats_cols=["k"],
        partition_by=["g"],
        properties={"owner": "etl"},
    )
    t.append(
        spark.createDataFrame([(1, 2.0, "a")], "k long, v double, g string")
    )
    t.add_constraint(spark, "pos", "v > 0")
    t.rename_column("v", "val")
    stmt = cat.execute(
        spark, "SHOW CREATE TABLE {{db.t}}"
    ).collect()[0].create_stmt
    assert stmt.startswith("CREATE TABLE {{db.t}} (")
    assert "  k long" in stmt and "  val double" in stmt
    assert "v double" not in stmt  # era-resolved live name only
    assert "PARTITIONED BY (g)" in stmt
    assert "STATS_COLS (k)" in stmt
    assert "CONSTRAINT pos CHECK (v > 0)" in stmt
    assert "'owner' = 'etl'" in stmt
    # near-miss + view refusal
    with pytest.raises(ValueError, match="SHOW CREATE TABLE"):
        cat.execute(spark, "SHOW CREATE {{db.t}}")
    cat.create_view("db.v", "SELECT k FROM {{db.t}}")
    with pytest.raises(ValueError):
        cat.execute(spark, "SHOW CREATE TABLE {{db.v}}")


def test_explain_pruning_grammar_shapes(spark, tmp_path):
    """r9 predicate grammar for the metadata-planner EXPLAIN rows
    (r8 verdict missing #3): `=`, `>`, `<`, `<=`, `>=`, and IN claim
    pruning verdicts like BETWEEN; a conjunct ANDed NEXT TO an
    OR-group still claims while anything INSIDE the group stays
    silent; an UNQUALIFIED conjunct with two candidate recorders is
    silent (r8 advisor: attribution must be unambiguous); quoted text
    that looks like a predicate never claims."""
    from iceberg_insert_spark.sources.catalog import LocalCatalog

    cat = LocalCatalog(str(tmp_path))
    cat.create_namespace("db")
    t = cat.create_table("db.fact", stats_cols=["k"])
    for lo in (0, 100, 200):
        t.append(
            spark.createDataFrame(
                [(lo + i, float(i)) for i in range(50)],
                "k long, v double",
            ).coalesce(1)
        )

    def prunes(stmt):
        return [
            r.item
            for r in cat.explain(spark, stmt).collect()
            if r.kind == "pruning"
        ]

    # equality: degenerate range + (absent) bloom -> middle file only
    p = prunes("SELECT * FROM {{db.fact}} WHERE k = 120")
    assert any("k = 120: files 1/3" in it for it in p)
    # one-sided ranges
    p = prunes("SELECT * FROM {{db.fact}} WHERE k > 210")
    assert any("k > 210: files 1/3" in it for it in p)
    p = prunes("SELECT * FROM {{db.fact}} WHERE k <= 49")
    assert any("k <= 49: files 1/3" in it for it in p)
    # IN list spanning two files
    p = prunes("SELECT * FROM {{db.fact}} WHERE k IN (5, 205)")
    assert any("k IN (5, 205): files 2/3" in it for it in p)
    # IN with a subquery never claims
    assert not prunes(
        "SELECT * FROM {{db.fact}} WHERE k IN "
        "(SELECT k FROM {{db.fact}})"
    )
    # != / <> never claim
    assert not prunes("SELECT * FROM {{db.fact}} WHERE k != 120")
    # conjunct NEXT TO an OR-group claims; the group's members do not
    p = prunes(
        "SELECT * FROM {{db.fact}} WHERE k BETWEEN 120 AND 160 "
        "AND (v = 1.0 OR k = 290)"
    )
    assert any("BETWEEN 120 AND 160: files 1/3" in it for it in p)
    assert not any("k = 290" in it for it in p)
    # top-level OR of claimable conjuncts claims the WHOLE clause
    # through plan_files(any_of=...) (r9 wave 13 — previously silent)
    p = prunes("SELECT * FROM {{db.fact}} WHERE k = 120 OR k = 220")
    assert any(
        "OR[k = 120 OR k = 220]: files 2/3" in it for it in p
    )
    # unqualified attribution resolves by LIVE SCHEMA ownership, not
    # by who records stats (r8 advisor + r9 review): db.dim RECORDS a
    # stats column named k but its live schema spells it j, so an
    # unqualified k names db.fact's column — the claim lands on fact
    # and NEVER on dim (attributing to the mere recorder was the
    # misinformation the advisor flagged)
    d = cat.create_table("db.dim", stats_cols=["k"])
    d.append(
        spark.createDataFrame(
            [(i, "x") for i in range(300)], "j long, g string"
        ).coalesce(1)
    )
    p = prunes(
        "SELECT * FROM {{db.fact}} f JOIN {{db.dim}} d ON f.k = d.j "
        "WHERE k = 120"
    )
    assert any(it.startswith("db.fact@") for it in p)
    assert not any(it.startswith("db.dim@") for it in p)
    p = prunes(
        "SELECT * FROM {{db.fact}} f JOIN {{db.dim}} d ON f.k = d.j "
        "WHERE f.k = 120"
    )
    assert any(it.startswith("db.fact@") for it in p)
    assert not any(it.startswith("db.dim@") for it in p)
    # clause scoping (r9 review): predicate-shaped text in the
    # SELECT list or a JOIN ON clause does not filter the outer scan
    # and must not claim; a quoted '(' must not corrupt the OR guard
    assert not prunes(
        "SELECT CASE WHEN k > 210 THEN 1 ELSE 0 END AS flag "
        "FROM {{db.fact}}"
    )
    assert not prunes(
        "SELECT * FROM {{db.fact}} f LEFT JOIN {{db.dim}} d "
        "ON f.k = 120 AND f.k = d.j"
    )
    assert not prunes(
        "SELECT * FROM {{db.fact}} "
        "WHERE CAST(v AS STRING) = '(' AND k = 120 OR v = 1.5"
    )
    # doubled-quote literals parse whole (no truncated-value claims)
    p = prunes(
        "SELECT * FROM {{db.fact}} "
        "WHERE CAST(v AS STRING) = 'it''s' AND k = 120"
    )
    assert any("k = 120: files 1/3" in it for it in p)
    assert not any(" = it" in it for it in p)
    # a predicate-shaped STRING literal never claims
    assert not prunes(
        "SELECT * FROM {{db.fact}} WHERE CAST(k AS STRING) = 'k > 5'"
    )


def _heal_worker(root):
    from iceberg_insert_spark.sources.catalog import LocalCatalog

    LocalCatalog(root)._heal_txns()
    return True


def test_txn_crash_window_heals_atomically_across_processes(
    spark, tmp_path
):
    """Multi-table transaction crash protocol: the committer dies
    right after the registry CAS (_mark_committed), publishing
    NOTHING. Direct main-branch readers still see only the seed rows
    (all-or-nothing held); then 6 OS processes race to heal — publish
    idempotence per wap_id means the transaction's rows land exactly
    once on each table, and the txn record retires."""
    import multiprocessing as mp

    root = str(tmp_path)
    cat = LocalCatalog(root)
    cat.create_namespace("db")
    f = cat.create_table("db.f")
    d = cat.create_table("db.d")
    f.append(
        spark.createDataFrame(
            [(i, float(i)) for i in range(0, 100, 2)], "k long, v double"
        )
    )
    d.append(
        spark.createDataFrame(
            [(i, f"c{i}") for i in range(0, 100, 2)], "k long, g string"
        )
    )
    txn = cat.begin_transaction()
    txn.append(
        "db.f",
        spark.createDataFrame(
            [(i, float(i)) for i in range(1, 100, 2)], "k long, v double"
        ),
    )
    txn.append(
        "db.d",
        spark.createDataFrame(
            [(i, f"c{i}") for i in range(1, 100, 2)], "k long, g string"
        ),
    )
    txn._mark_committed()  # committer crashes here
    # staged rows are durable but invisible: all-or-nothing holds
    assert f.read(spark).count() == 50
    assert d.read(spark).count() == 50
    ctx = mp.get_context("spawn")
    with ctx.Pool(6) as pool:
        assert all(pool.map(_heal_worker, [root] * 6))
    # exactly once on BOTH tables, record retired
    fk = [r.k for r in f.read(spark).collect()]
    dk = [r.k for r in d.read(spark).collect()]
    assert sorted(fk) == list(range(100))  # no duplicates, no gaps
    assert sorted(dk) == list(range(100))
    assert "txns" not in cat._read()
    # and a catalog read AFTER a fresh commit+crash heals inline
    txn2 = cat.begin_transaction()
    txn2.append(
        "db.f",
        spark.createDataFrame([(1000, 1.0)], "k long, v double"),
    )
    txn2.append(
        "db.d",
        spark.createDataFrame([(1000, "x")], "k long, g string"),
    )
    txn2._mark_committed()
    assert cat.load_table("db.f").read(spark).count() == 101
    assert cat.load_table("db.d").read(spark).count() == 101


def test_txn_abort_and_api_guards(spark, tmp_path):
    """abort leaves nothing visible (staged snapshots expire like
    rejected WAP stages); a finished transaction refuses further use;
    two appends to ONE table in a txn land as two cherry-picks; an
    empty commit is a no-op."""
    cat = LocalCatalog(str(tmp_path))
    cat.create_namespace("db")
    t = cat.create_table("db.t")
    t.append(spark.createDataFrame([(0, 0.0)], "k long, v double"))
    txn = cat.begin_transaction()
    txn.append(
        "db.t", spark.createDataFrame([(1, 1.0)], "k long, v double")
    )
    txn.abort()
    assert t.read(spark).count() == 1
    assert "txns" not in cat._read()
    with pytest.raises(ValueError, match="already committed/aborted"):
        txn.commit()
    # two appends to the same table within one transaction
    txn2 = cat.begin_transaction()
    txn2.append(
        "db.t", spark.createDataFrame([(2, 2.0)], "k long, v double")
    )
    txn2.append(
        "db.t", spark.createDataFrame([(3, 3.0)], "k long, v double")
    )
    assert t.read(spark).count() == 1  # still invisible
    heads = txn2.commit()
    assert set(heads) == {"db.t"}
    ks = sorted(r.k for r in t.read(spark).collect())
    assert ks == [0, 2, 3]
    # empty transaction commits as a no-op
    assert cat.begin_transaction().commit() == {}
    # a concurrent plain append between stage and commit merges
    txn3 = cat.begin_transaction()
    txn3.append(
        "db.t", spark.createDataFrame([(4, 4.0)], "k long, v double")
    )
    t.append(spark.createDataFrame([(5, 5.0)], "k long, v double"))
    txn3.commit()
    ks = sorted(r.k for r in t.read(spark).collect())
    assert ks == [0, 2, 3, 4, 5]


def test_txn_quarantine_rename_and_drop_guards(spark, tmp_path):
    """Failure containment for the transaction protocol: a committed
    txn whose staged snapshot is destroyed QUARANTINES (reads of
    unrelated tables keep working, verify() reports it,
    retry_failed_transaction re-arms); rename_table carries pending
    txn steps to the new identifier; drop_table refuses while a txn
    still owes the table a publish."""
    import shutil

    cat = LocalCatalog(str(tmp_path))
    cat.create_namespace("db")
    a = cat.create_table("db.a")
    b = cat.create_table("db.b")
    a.append(spark.createDataFrame([(0, 0.0)], "k long, v double"))
    b.append(spark.createDataFrame([(0, 0.0)], "k long, v double"))
    # rename between commit CAS and heal: steps follow the pointer
    txn = cat.begin_transaction()
    txn.append(
        "db.a", spark.createDataFrame([(1, 1.0)], "k long, v double")
    )
    txn._mark_committed()
    cat.rename_table("db.a", "db.a2")
    assert cat.load_table("db.a2").read(spark).count() == 2  # healed
    assert "txns" not in cat._read()
    # drop refusal while a txn owes the table a publish
    txn2 = cat.begin_transaction()
    txn2.append(
        "db.b", spark.createDataFrame([(1, 1.0)], "k long, v double")
    )
    txn2._mark_committed()
    with pytest.raises(ValueError, match="pending transaction"):
        cat.drop_table("db.b")
    # quarantine: destroy the staged snapshot's manifest, then read an
    # UNRELATED table — must succeed, with the txn parked as failed
    rec = cat._read()["txns"][txn2.txn_id]
    sv = rec["steps"][0][1]
    os.remove(
        os.path.join(cat._entry("db.b")["location"], "_manifests", f"v{sv}.json")
    )
    assert cat.load_table("db.a2").read(spark).count() == 2
    assert cat.verify()["failed_txns"] == [txn2.txn_id]
    assert list(cat.failed_transactions()) == [txn2.txn_id]
    # restore the staged manifest? gone for good here — retry fails
    # loudly and stays quarantined
    with pytest.raises(RuntimeError, match="failed again"):
        cat.retry_failed_transaction(txn2.txn_id)
    # unknown ids get the clean error
    with pytest.raises(ValueError, match="no failed transaction"):
        cat.retry_failed_transaction("nope")
    shutil.rmtree(str(tmp_path), ignore_errors=True)


def test_sql_statement_snapshot_fence(spark, tmp_path):
    """sql() pins every bare ref inside one txn_seq fence: a
    transaction committing between two refs' resolutions cannot be
    half-seen by one statement. Simulated by committing a txn from
    inside the resolution window via a monkeypatched read hook is
    overkill here — instead pin the mechanics: pins resolve to the
    pre-commit heads, and a post-commit statement sees both tables
    move together."""
    cat = LocalCatalog(str(tmp_path))
    cat.create_namespace("db")
    f = cat.create_table("db.f")
    d = cat.create_table("db.d")
    f.append(spark.createDataFrame([(0, 0.0)], "k long, v double"))
    d.append(spark.createDataFrame([(0, "a")], "k long, g string"))
    q = (
        "SELECT (SELECT COUNT(*) FROM {{db.f}}) AS nf, "
        "(SELECT COUNT(*) FROM {{db.d}}) AS nd"
    )
    r = cat.sql(spark, q).collect()[0]
    assert (r.nf, r.nd) == (1, 1)
    txn = cat.begin_transaction()
    txn.append(
        "db.f", spark.createDataFrame([(1, 1.0)], "k long, v double")
    )
    txn.append(
        "db.d", spark.createDataFrame([(1, "b")], "k long, g string")
    )
    txn.commit()
    r = cat.sql(spark, q).collect()[0]
    assert (r.nf, r.nd) == (2, 2)  # both moved together


def _policied_cat(spark, tmp_path):
    cat = LocalCatalog(str(tmp_path / "cat"))
    cat.create_namespace("gov")
    cat.create_table("gov.t").append(
        spark.createDataFrame(
            [(1, "alice", 10.0, "EU"), (2, "bob", -5.0, "EU"),
             (3, "carol", 7.0, "US"), (4, "dave", 3.0, "US")],
            "id long, name string, bal double, region string",
        )
    )
    return cat


def test_policies_filter_and_masks_compose(spark, tmp_path):
    """Row filter on unmasked rows; masks see the unmasked tuple;
    masks preserve column types; drop restores."""
    cat = _policied_cat(spark, tmp_path)
    cat.set_row_filter("gov.t", "bal > 0")
    cat.set_column_mask(
        "gov.t",
        "name",
        "CASE WHEN region = 'EU' THEN name ELSE 'X' END",
    )
    cat.set_column_mask("gov.t", "bal", "NULL")
    rows = {
        (r.id, r.name, r.bal)
        for r in cat.sql(spark, "SELECT * FROM {{gov.t}}").collect()
    }
    # bob (bal<0) filtered on the RAW value even though bal masks to
    # NULL; carol/dave redacted because region!='EU' pre-mask
    assert rows == {(1, "alice", None), (3, "X", None), (4, "X", None)}
    df = cat.sql(spark, "SELECT * FROM {{gov.t}}")
    assert dict(df.dtypes)["bal"] == "double"  # type-preserving mask
    cat.drop_column_mask("gov.t", "name")
    cat.drop_row_filter("gov.t")
    rows = {
        (r.id, r.name)
        for r in cat.sql(spark, "SELECT * FROM {{gov.t}}").collect()
    }
    assert rows == {(1, "alice"), (2, "bob"), (3, "carol"), (4, "dave")}
    pol = cat.table_policies("gov.t")
    assert pol["row_filter"] is None and list(pol["column_masks"]) == ["bal"]


def test_policies_flow_through_views_and_pins(spark, tmp_path):
    cat = _policied_cat(spark, tmp_path)
    cat.create_view(
        "gov.v", "SELECT region, COUNT(*) AS n FROM {{gov.t}} GROUP BY region"
    )
    cat.set_row_filter("gov.t", "region = 'EU'")
    got = {(r.region, r.n) for r in cat.read_view(spark, "gov.v").collect()}
    assert got == {("EU", 2)}
    # pinned (@N) reads are catalog-mediated too — still policied
    v1 = cat.load_table("gov.t").snapshots()[0]
    n = cat.sql(
        spark, "SELECT COUNT(*) AS n FROM {{gov.t@%d}}" % v1
    ).collect()[0].n
    assert n == 2
    # the direct filesystem handle is the documented admin bypass
    assert cat.load_table("gov.t").read(spark).count() == 4


def test_policies_bad_exprs_raise_naming_the_policy(spark, tmp_path):
    cat = _policied_cat(spark, tmp_path)
    cat.set_column_mask("gov.t", "ghost", "1")
    with pytest.raises(ValueError, match="missing column.*ghost"):
        cat.sql(spark, "SELECT * FROM {{gov.t}}")
    cat.drop_column_mask("gov.t", "ghost")
    cat.set_row_filter("gov.t", "no_such_col > 0")
    with pytest.raises(ValueError, match="row filter on 'gov.t'"):
        cat.sql(spark, "SELECT * FROM {{gov.t}}")
    with pytest.raises(ValueError, match="non-empty SQL"):
        cat.set_row_filter("gov.t", "")
    with pytest.raises(ValueError, match="does not exist"):
        cat.set_column_mask("gov.nope", "x", "1")


def test_policies_apply_to_insert_select_sources(spark, tmp_path):
    """INSERT INTO ... SELECT from a policied table copies only what
    the policy exposes (the SELECT runs through sql())."""
    cat = _policied_cat(spark, tmp_path)
    cat.set_row_filter("gov.t", "region = 'US'")
    cat.create_table("gov.copy")
    cat.sql_insert(
        spark, "INSERT INTO {{gov.copy}} SELECT * FROM {{gov.t}}"
    )
    cat.drop_row_filter("gov.t")
    assert cat.load_table("gov.copy").read(spark).count() == 2


def test_dml_respects_row_filter(spark, tmp_path):
    """Front-end DELETE/UPDATE only touch rows the row filter exposes
    (r9 ADVICE, medium): the filter conjoins into the DML predicate,
    so hidden rows survive a DELETE and keep their values through an
    UPDATE — while the admin handle still sees everything."""
    cat = _policied_cat(spark, tmp_path)
    cat.set_row_filter("gov.t", "region = 'US'")
    # matches all four rows unfiltered; only the two US rows may go
    cat.execute(spark, "DELETE FROM {{gov.t}} WHERE id >= 1")
    cat.drop_row_filter("gov.t")
    left = {
        r.id for r in cat.load_table("gov.t").read(spark).collect()
    }
    assert left == {1, 2}  # EU rows (hidden from the deleter) survive
    cat.set_row_filter("gov.t", "id = 1")
    cat.execute(
        spark, "UPDATE {{gov.t}} SET bal = 99.0 WHERE bal < 100"
    )
    cat.drop_row_filter("gov.t")
    bals = {
        r.id: r.bal
        for r in cat.load_table("gov.t").read(spark).collect()
    }
    assert bals[1] == 99.0 and bals[2] == -5.0  # hidden row untouched


def test_dml_refuses_masked_column_references(spark, tmp_path):
    """A masked column referenced in a DML predicate or SET expression
    refuses naming the policy — DML evaluates raw rows, so either
    reference would probe or launder the value the mask hides."""
    cat = _policied_cat(spark, tmp_path)
    cat.set_column_mask("gov.t", "bal", "NULL")
    with pytest.raises(ValueError, match="masked column.*bal"):
        cat.execute(spark, "DELETE FROM {{gov.t}} WHERE bal < 0")
    with pytest.raises(ValueError, match="masked column.*bal"):
        cat.execute(
            spark,
            "UPDATE {{gov.t}} SET name = CAST(bal AS STRING) "
            "WHERE id = 1",
        )
    # writing TO the masked column reveals nothing -> allowed
    cat.execute(spark, "UPDATE {{gov.t}} SET bal = 0.0 WHERE id = 1")
    cat.drop_column_mask("gov.t", "bal")
    bals = {
        r.id: r.bal
        for r in cat.load_table("gov.t").read(spark).collect()
    }
    assert bals[1] == 0.0
    # unrelated DML on a policied table is untouched by the guard
    cat.set_column_mask("gov.t", "name", "'X'")
    cat.execute(spark, "DELETE FROM {{gov.t}} WHERE id = 4")
    assert cat.load_table("gov.t").read(spark).count() == 3


def test_overwrite_refused_under_row_filter(spark, tmp_path):
    """INSERT OVERWRITE through the front-end refuses on a
    row-filtered table: the replace would destroy the rows the policy
    hides from the statement's own author."""
    cat = _policied_cat(spark, tmp_path)
    cat.set_row_filter("gov.t", "region = 'US'")
    with pytest.raises(ValueError, match="row filter"):
        cat.execute(
            spark,
            "INSERT OVERWRITE {{gov.t}} SELECT * FROM {{gov.t}}",
        )
    # masks alone do not block a pure write
    cat.drop_row_filter("gov.t")
    cat.set_column_mask("gov.t", "name", "'X'")
    cat.execute(
        spark,
        "INSERT OVERWRITE {{gov.t}} SELECT * FROM {{gov.t}} "
        "WHERE id <= 2",
    )
    cat.drop_column_mask("gov.t", "name")
    got = cat.load_table("gov.t").read(spark)
    assert got.count() == 2
    # the SELECT source ran through sql() -> it saw MASKED names
    assert {r.name for r in got.collect()} == {"X"}


def test_mask_lossy_cast_refuses_naming_policy(spark, tmp_path):
    """A mask whose resolved type cannot cast losslessly to the
    column's type raises at read (r9 ADVICE): Spark cast semantics
    would silently null the column instead — 'REDACTED' on a number
    must be a policy ERROR, not a quiet degrade."""
    cat = _policied_cat(spark, tmp_path)
    cat.set_column_mask("gov.t", "bal", "'REDACTED'")
    with pytest.raises(ValueError, match="cast losslessly"):
        cat.sql(spark, "SELECT * FROM {{gov.t}}")
    # lossless directions still work: int literal on a long column,
    # numeric on string (to-string is total), NULL anywhere
    cat.set_column_mask("gov.t", "bal", "0.0")
    cat.set_column_mask("gov.t", "id", "CAST(7 AS INT)")
    cat.set_column_mask("gov.t", "name", "id * 10")
    rows = cat.sql(spark, "SELECT * FROM {{gov.t}}").collect()
    assert {r.id for r in rows} == {7}
    assert {r.bal for r in rows} == {0.0}
    assert {r.name for r in rows} == {"10", "20", "30", "40"}


def test_policy_scope_direct_handles_and_streams(spark, tmp_path):
    """Pin the governance scope statement (r9 verdict #6): policies
    bind at catalog resolution — a DIRECT SnapshotTable handle and
    streaming/incremental readers built from one see raw rows (the
    admin path, gated by storage ACLs in a real deployment), while
    catalog-mediated pinned reads apply the CURRENT policies."""
    cat = _policied_cat(spark, tmp_path)
    cat.set_row_filter("gov.t", "region = 'US'")
    cat.set_column_mask("gov.t", "name", "'X'")
    # catalog-mediated: filtered + masked
    gov = cat.sql(spark, "SELECT * FROM {{gov.t}}").collect()
    assert len(gov) == 2 and {r.name for r in gov} == {"X"}
    # pinned catalog read: CURRENT policies still apply
    pinned = cat.sql(spark, "SELECT * FROM {{gov.t@1}}").collect()
    assert len(pinned) == 2 and {r.name for r in pinned} == {"X"}
    # direct handle: raw — the documented bypass surface
    raw = cat.load_table("gov.t").read(spark).collect()
    assert len(raw) == 4 and "alice" in {r.name for r in raw}
    # incremental/changelog-style reader from a direct handle: raw
    tbl = cat.load_table("gov.t")
    from iceberg_insert_spark.sources.snapshots.incremental import (
        _read_incremental,
    )

    tbl.append(
        spark.createDataFrame(
            [(5, "erin", 1.0, "EU")],
            "id long, name string, bal double, region string",
        )
    )
    inc = _read_incremental(tbl, spark, 1, 2).collect()
    assert {r.name for r in inc} == {"erin"}


def test_policies_in_describe_output(spark, tmp_path):
    cat = _policied_cat(spark, tmp_path)
    cat.set_row_filter("gov.t", "bal > 0")
    cat.set_column_mask("gov.t", "name", "'X'")
    info = {
        r.col_name: r.info
        for r in cat.describe_table(spark, "gov.t").collect()
        if r.col_name in ("row_filter", "column_masks")
    }
    assert info["row_filter"] == "bal > 0"
    assert "name: 'X'" in info["column_masks"]


def test_policy_change_staleness_reaches_materialized_views(spark, tmp_path):
    """A row-filter/mask change with ZERO data commits must flip a
    fresh MV to stale so the live fallback serves policied rows — a
    storage-served MV would otherwise leak pre-policy data through a
    catalog-mediated read (review catch)."""
    cat = _policied_cat(spark, tmp_path)
    cat.create_materialized_view(
        "gov.mv", "SELECT COUNT(*) AS n FROM {{gov.t}}"
    )
    cat.refresh_materialized(spark, "gov.mv")
    assert not cat.is_stale("gov.mv")
    df, from_storage = cat.read_materialized(spark, "gov.mv")
    assert from_storage and df.collect()[0].n == 4
    cat.set_row_filter("gov.t", "region = 'EU'")
    assert cat.is_stale("gov.mv")  # no data commit happened
    df, from_storage = cat.read_materialized(spark, "gov.mv")
    assert not from_storage and df.collect()[0].n == 2
    # refresh re-materializes THROUGH the policy and is fresh again;
    # dropping the policy is itself a freshness event
    cat.refresh_materialized(spark, "gov.mv")
    df, from_storage = cat.read_materialized(spark, "gov.mv")
    assert from_storage and df.collect()[0].n == 2
    cat.drop_row_filter("gov.t")
    assert cat.is_stale("gov.mv")


def test_alter_table_policy_verbs(spark, tmp_path):
    """Console spellings: ALTER TABLE ... SET/DROP ROW FILTER and
    SET/DROP COLUMN MASK dispatch through execute(), return the
    resulting policy set, and survive quoted expressions verbatim."""
    cat = _policied_cat(spark, tmp_path)
    pol = cat.execute(
        spark, "ALTER TABLE {{gov.t}} SET ROW FILTER region = 'EU'"
    )
    assert pol["row_filter"] == "region = 'EU'"
    cat.execute(
        spark,
        "ALTER TABLE {{gov.t}} SET COLUMN MASK name "
        "CASE WHEN region = 'EU' THEN name ELSE 'X' END",
    )
    rows = {
        (r.id, r.name)
        for r in cat.sql(spark, "SELECT * FROM {{gov.t}}").collect()
    }
    assert rows == {(1, "alice"), (2, "bob")}
    pol = cat.execute(spark, "ALTER TABLE {{gov.t}} DROP COLUMN MASK name")
    assert pol["column_masks"] == {}
    pol = cat.execute(spark, "ALTER TABLE {{gov.t}} DROP ROW FILTER")
    assert pol["row_filter"] is None
    assert cat.sql(spark, "SELECT COUNT(*) AS n FROM {{gov.t}}").collect()[0].n == 4
    with pytest.raises(ValueError, match="expected 'ALTER TABLE"):
        cat.execute(spark, "ALTER TABLE {{gov.t}} ADD COLUMN x INT")
    with pytest.raises(ValueError, match="does not exist"):
        cat.execute(spark, "ALTER TABLE {{gov.nope}} DROP ROW FILTER")


def test_explain_or_tree_claims(spark, tmp_path):
    """OR-tree EXPLAIN claims (r9): a top-disjunctive WHERE claims as
    ONE clause iff every disjunct decomposes to claimable conjuncts
    attributing to a single table's stats columns; anything less
    keeps the conservative silence (all-or-nothing)."""
    from iceberg_insert_spark.sources.catalog import LocalCatalog

    cat = LocalCatalog(str(tmp_path))
    cat.create_namespace("db")
    t = cat.create_table("db.fact", stats_cols=["k"])
    for lo in (0, 100, 200):
        t.append(
            spark.createDataFrame(
                [(lo + i, float(i)) for i in range(50)],
                "k long, v double",
            ).coalesce(1)
        )

    def prunes(stmt):
        return [
            r.item
            for r in cat.explain(spark, stmt).collect()
            if r.kind == "pruning"
        ]

    # two open ranges: middle file pruned
    p = prunes("SELECT * FROM {{db.fact}} WHERE k <= 40 OR k > 210")
    assert any(": files 2/3" in it and it.count("OR[") for it in p)
    # AND inside a parenthesized branch + IN branch
    p = prunes(
        "SELECT * FROM {{db.fact}} WHERE (k >= 200 AND k <= 240) "
        "OR k IN (5)"
    )
    assert any(": files 2/3" in it for it in p)
    # nested disjunction inside a branch recurses
    p = prunes(
        "SELECT * FROM {{db.fact}} WHERE k <= 40 OR "
        "(k >= 100 AND (k = 120 OR k = 130))"
    )
    assert any(": files 2/3" in it for it in p)
    # BETWEEN inside a branch: its own AND must not sever it
    # (review catch — the branch splitter cut BETWEEN at AND)
    p = prunes(
        "SELECT * FROM {{db.fact}} WHERE k BETWEEN 120 AND 160 "
        "OR k = 5"
    )
    assert any(": files 2/3" in it for it in p)
    # disjuncts across TWO ALIASES of the SAME table never claim: the
    # disjunction applies to neither scan alone (review catch — the
    # one-ref-key gate passed self-joins)
    assert not prunes(
        "SELECT * FROM {{db.fact}} a JOIN {{db.fact}} b "
        "ON a.k = b.k WHERE a.k = 120 OR b.k = 220"
    )
    # disjuncts on ONE alias of a self-join DO claim, but the claim
    # names the alias — the other scan of the same table is unpruned
    # and a bare-table attribution would overstate it (r9 ADVICE)
    p = prunes(
        "SELECT * FROM {{db.fact}} a JOIN {{db.fact}} b "
        "ON a.k = b.k WHERE a.k = 120 OR a.k = 220"
    )
    assert any(" AS a.OR[" in it and ": files 2/3" in it for it in p)
    # single-scan claims carry NO alias tag (the common case's text
    # is unchanged)
    p = prunes("SELECT * FROM {{db.fact}} WHERE k = 120 OR k = 220")
    assert any(".OR[" in it and " AS " not in it for it in p)
    # one unclaimable disjunct (LIKE) silences the WHOLE clause
    assert not prunes(
        "SELECT * FROM {{db.fact}} WHERE k = 120 OR v LIKE 'x%'"
    )
    # NOT anywhere silences
    assert not prunes(
        "SELECT * FROM {{db.fact}} WHERE k = 120 OR NOT (k = 5)"
    )
    # a quoted 'OR' is data, not structure: the clause is a single
    # claimable conjunct on g... (string col has no stats) -> silent,
    # and crucially no crash / no fabricated disjunction
    t2 = cat.create_table("db.s", stats_cols=["k"])
    t2.append(
        spark.createDataFrame(
            [(1, "a OR b")], "k long, g string"
        ).coalesce(1)
    )
    assert not prunes("SELECT * FROM {{db.s}} WHERE g = 'a OR b'")
    # disjuncts across TWO tables never claim (attribution must be
    # one table)
    d = cat.create_table("db.dim", stats_cols=["m"])
    d.append(
        spark.createDataFrame(
            [(i, 1.0) for i in range(10)], "m long, w double"
        ).coalesce(1)
    )
    assert not prunes(
        "SELECT * FROM {{db.fact}} f JOIN {{db.dim}} d ON f.k = d.m "
        "WHERE f.k = 120 OR d.m = 5"
    )


def test_policy_flip_under_concurrent_reads_is_atomic(spark, tmp_path):
    """Readers racing a policy flip see either the old or the new
    policy applied in full — never a crash, never a half state (the
    registry's atomic-rename write is the guarantee)."""
    from concurrent.futures import ThreadPoolExecutor

    cat = _policied_cat(spark, tmp_path)

    def flip(i):
        if i % 2:
            cat.set_row_filter("gov.t", "region = 'EU'")
        else:
            cat.drop_row_filter("gov.t")
        return True

    def read(_):
        n = cat.sql(
            spark, "SELECT COUNT(*) AS n FROM {{gov.t}}"
        ).collect()[0].n
        return n

    with ThreadPoolExecutor(4) as ex:
        flips = list(ex.map(flip, range(6)))
        counts = list(ex.map(read, range(8)))
    assert all(flips)
    assert set(counts) <= {2, 4}  # filtered or unfiltered, nothing else


def test_txn_replace_conflict_aborts_whole_transaction(spark, tmp_path):
    """Staged-replace conflict handling (r9 verdict #4): a commit
    landing on the replaced table between stage and commit aborts
    the WHOLE transaction pre-CAS — nothing visible on EITHER table
    — and a re-planned transaction then succeeds."""
    from iceberg_insert_spark.sources.snapshots.errors import (
        CommitConflict,
    )

    cat = LocalCatalog(str(tmp_path))
    cat.create_namespace("db")
    fact = cat.create_table("db.fact")
    dim = cat.create_table("db.dim")
    for k in range(3):
        fact.append(
            spark.createDataFrame(
                [(k, float(k))], "k long, v double"
            ).coalesce(1)
        )
    dim.append(spark.createDataFrame([(0, "a")], "k long, s string"))
    txn = cat.begin_transaction()
    txn.compact(spark, "db.fact", target_files=1)
    txn.append(
        "db.dim", spark.createDataFrame([(1, "b")], "k long, s string")
    )
    # racing direct writer advances the fact head mid-transaction
    fact.append(
        spark.createDataFrame([(9, 9.0)], "k long, v double").coalesce(1)
    )
    with pytest.raises(CommitConflict, match="advanced past"):
        txn.commit()
    # all-invisible: dim untouched, fact = base + racer, 4 live files
    assert dim.read(spark).count() == 1
    ks = sorted(r.k for r in fact.read(spark).collect())
    assert ks == [0, 1, 2, 9]
    assert len(fact._manifest(fact._latest_published())) == 4
    assert "txns" not in cat._read()
    # re-planned transaction compacts the NEW state and succeeds
    txn2 = cat.begin_transaction()
    txn2.compact(spark, "db.fact", target_files=1)
    txn2.append(
        "db.dim", spark.createDataFrame([(1, "b")], "k long, s string")
    )
    heads = txn2.commit()
    assert set(heads) == {"db.fact", "db.dim"}
    assert len(fact._manifest(fact._latest_published())) == 1
    assert sorted(r.k for r in fact.read(spark).collect()) == ks
    assert dim.read(spark).count() == 2


def test_txn_replace_post_cas_conflict_quarantines_all_invisible(
    spark, tmp_path
):
    """The honest residual window: a raw-filesystem writer landing
    AFTER the CAS but before the roll-forward quarantines the
    transaction — and because replace steps publish FIRST, the
    quarantine leaves NOTHING of the transaction visible (the dim
    append is still unpublished), never half."""
    cat = LocalCatalog(str(tmp_path))
    cat.create_namespace("db")
    fact = cat.create_table("db.fact")
    dim = cat.create_table("db.dim")
    fact.append(spark.createDataFrame([(0, 0.0)], "k long, v double"))
    dim.append(spark.createDataFrame([(0, "a")], "k long, s string"))
    txn = cat.begin_transaction()
    txn.compact(spark, "db.fact", target_files=1)
    txn.append(
        "db.dim", spark.createDataFrame([(1, "b")], "k long, s string")
    )
    txn._mark_committed()  # committer 'crashes' here
    # raw handle racer slips into the crash window
    fact.append(spark.createDataFrame([(7, 7.0)], "k long, v double"))
    # next catalog read heals -> replace conflicts -> quarantine;
    # the read itself keeps working
    assert cat.load_table("db.dim").read(spark).count() == 1
    failed = cat.failed_transactions()
    assert len(failed) == 1
    (rec,) = failed.values()
    assert "re-stage" in rec["error"]
    # nothing of the transaction is visible on either table
    assert sorted(
        r.k for r in cat.load_table("db.fact").read(spark).collect()
    ) == [0, 7]
    assert cat.load_table("db.dim").read(spark).count() == 1


def test_txn_replace_heals_on_read_and_step_guards(spark, tmp_path):
    """A committed-but-unpublished replace+append transaction heals on
    the next catalog read (replace first); an append AFTER a replace
    on the same table stages fine and publishes in staging order
    (r11); a replace AFTER an append still refuses (publish order
    would silently reorder it ahead of the append)."""
    cat = LocalCatalog(str(tmp_path))
    cat.create_namespace("db")
    fact = cat.create_table("db.fact")
    dim = cat.create_table("db.dim")
    for k in range(2):
        fact.append(
            spark.createDataFrame(
                [(k, float(k))], "k long, v double"
            ).coalesce(1)
        )
    dim.append(spark.createDataFrame([(0, "a")], "k long, s string"))
    txn = cat.begin_transaction()
    txn.overwrite(
        "db.fact",
        spark.createDataFrame([(42, 42.0)], "k long, v double"),
    )
    # r11: "OVERWRITE …; INSERT INTO …" on one table = whole next
    # state, then rows on top — publishes in staging order
    txn.append(
        "db.fact",
        spark.createDataFrame([(3, 3.0)], "k long, v double"),
    )
    txn.append(
        "db.dim", spark.createDataFrame([(1, "b")], "k long, s string")
    )
    # nothing visible pre-commit
    assert fact.read(spark).count() == 2
    txn._mark_committed()  # crash before publish
    # heal-on-read completes all three, atomically visible
    got = cat.load_table("db.fact").read(spark).collect()
    assert sorted((r.k, r.v) for r in got) == [(3, 3.0), (42, 42.0)]
    assert cat.load_table("db.dim").read(spark).count() == 2
    assert "txns" not in cat._read()
    # append-then-replace on one table refuses (reorder hazard)
    txn2 = cat.begin_transaction()
    txn2.append(
        "db.dim", spark.createDataFrame([(2, "c")], "k long, s string")
    )
    with pytest.raises(ValueError, match="FIRST step"):
        txn2.overwrite(
            "db.dim",
            spark.createDataFrame([(9, "z")], "k long, s string"),
        )
    txn2.abort()


def test_abort_failed_transaction(spark, tmp_path):
    """The operator's other exit from quarantine (r10): a replace
    conflicted in the post-CAS window can never retry forward —
    abort_failed_transaction abandons it (record gone, reads clean,
    staged snapshots await expire), but REFUSES once any step has
    published (that state must go forward, not freeze)."""
    cat = LocalCatalog(str(tmp_path))
    cat.create_namespace("db")
    fact = cat.create_table("db.fact")
    dim = cat.create_table("db.dim")
    fact.append(
        spark.createDataFrame([(0, 0.0)], "k long, v double").coalesce(1)
    )
    dim.append(
        spark.createDataFrame([(0, "a")], "k long, s string").coalesce(1)
    )
    txn = cat.begin_transaction()
    txn.compact(spark, "db.fact", target_files=1)
    txn.append(
        "db.dim", spark.createDataFrame([(1, "b")], "k long, s string")
    )
    txn._mark_committed()
    fact.append(  # racer in the crash window -> replace can never land
        spark.createDataFrame([(7, 7.0)], "k long, v double").coalesce(1)
    )
    cat.load_table("db.dim")  # heal -> quarantine
    (txn_id,) = cat.failed_transactions()
    with pytest.raises(ValueError, match="no failed transaction"):
        cat.abort_failed_transaction("txn-nope")
    cat.abort_failed_transaction(txn_id)
    assert cat.failed_transactions() == {}
    assert "txns" not in cat._read()
    # nothing of the transaction ever became visible
    assert sorted(
        r.k for r in cat.load_table("db.fact").read(spark).collect()
    ) == [0, 7]
    assert cat.load_table("db.dim").read(spark).count() == 1
    # a quarantined txn with a PUBLISHED step refuses to abandon:
    # build one by dropping the dim mid-roll-forward so the fact
    # append publishes and the dim step quarantines
    txn2 = cat.begin_transaction()
    txn2.append(
        "db.fact",
        spark.createDataFrame([(1, 1.0)], "k long, v double"),
    )
    txn2.append(
        "db.dim", spark.createDataFrame([(2, "c")], "k long, s string")
    )
    txn2._mark_committed()
    # simulate the dim's staged snapshot vanishing (expire raced)
    import shutil

    dim_loc = cat._read()["tables"]["db.dim"]["location"]
    shutil.rmtree(os.path.join(dim_loc, "_manifests"))
    cat._heal_txns()
    failed = cat.failed_transactions()
    if failed:  # fact step published, dim step broke
        (t2,) = failed
        with pytest.raises(ValueError, match="already published"):
            cat.abort_failed_transaction(t2)


def test_txn_compact_partitioned_table_keeps_spec(spark, tmp_path):
    """Transactional compact of a PARTITIONED table: the staged
    replace rewrites through the partition spec (hive shadow dirs,
    per-file partition records), so post-publish partition pruning
    still proves file skips from the manifest alone."""
    cat = LocalCatalog(str(tmp_path))
    cat.create_namespace("db")
    t = cat.create_table("db.p", partition_by=["day"])
    rows = [(d, i, float(i)) for d in ("a", "b") for i in range(6)]
    for chunk in (rows[:4], rows[4:8], rows[8:]):
        t.append(
            spark.createDataFrame(
                chunk, "day string, k long, v double"
            ).coalesce(1)
        )
    pre = {
        (r.day, r.k) for r in t.read(spark).collect()
    }
    txn = cat.begin_transaction()
    txn.compact(spark, "db.p", target_files=1)
    txn.commit()
    t2 = cat.load_table("db.p")
    assert {
        (r.day, r.k) for r in t2.read(spark).collect()
    } == pre
    # per-file partition records survived the rewrite: pruning to one
    # day keeps a strict file subset, proven from metadata
    kept, total = t2.plan_files(partitions={"day": "a"})
    assert 0 < len(kept) < total


def test_two_txns_racing_one_replace_serialize_at_the_cas(
    spark, tmp_path
):
    """Two catalog-mediated transactions both compacting one table:
    the in-CAS validation (head still at base + no committed txn
    owing the table a publish) lets exactly ONE commit; the other
    aborts pre-CAS with CommitConflict — no quarantine, nothing
    half-visible, and a re-planned retry succeeds."""
    from concurrent.futures import ThreadPoolExecutor

    from iceberg_insert_spark.sources.snapshots.errors import (
        CommitConflict,
    )

    cat = LocalCatalog(str(tmp_path))
    cat.create_namespace("db")
    fact = cat.create_table("db.fact")
    for k in range(3):
        fact.append(
            spark.createDataFrame(
                [(k, float(k))], "k long, v double"
            ).coalesce(1)
        )
    t1 = cat.begin_transaction()
    t1.compact(spark, "db.fact", target_files=1)
    t2 = cat.begin_transaction()
    t2.compact(spark, "db.fact", target_files=2)

    def _commit(txn):
        try:
            return ("ok", txn.commit())
        except CommitConflict as e:
            return ("conflict", str(e))

    with ThreadPoolExecutor(2) as ex:
        r1, r2 = list(ex.map(_commit, (t1, t2)))
    outcomes = sorted(x[0] for x in (r1, r2))
    assert outcomes == ["conflict", "ok"]
    # loser aborted pre-CAS: registry clean, no quarantine
    assert cat.failed_transactions() == {}
    assert "txns" not in cat._read()
    t = cat.load_table("db.fact")
    files = len(t._manifest(t._latest_published()))
    assert files in (1, 2)  # exactly the winner's layout
    assert sorted(r.k for r in t.read(spark).collect()) == [0, 1, 2]
    # the loser re-plans against the new state and succeeds
    t3 = cat.begin_transaction()
    t3.compact(spark, "db.fact", target_files=3)
    t3.commit()
    t = cat.load_table("db.fact")
    assert sorted(r.k for r in t.read(spark).collect()) == [0, 1, 2]


def test_txn_replace_vs_direct_writer_never_quarantines(
    spark, tmp_path
):
    """The r10 lock-spanned commit: a DIRECT writer racing a live
    committing transaction can no longer open the post-CAS window —
    either it lands first (the transaction aborts pre-CAS with
    CommitConflict) or it blocks on the table's commit lock and
    lands after the replace. In NO interleaving does a live
    committer quarantine."""
    from concurrent.futures import ThreadPoolExecutor

    from iceberg_insert_spark.sources.snapshots.errors import (
        CommitConflict,
    )

    for trial in range(3):
        cat = LocalCatalog(str(tmp_path / f"c{trial}"))
        cat.create_namespace("db")
        fact = cat.create_table("db.fact")
        for k in range(3):
            fact.append(
                spark.createDataFrame(
                    [(k, float(k))], "k long, v double"
                ).coalesce(1)
            )
        txn = cat.begin_transaction()
        txn.compact(spark, "db.fact", target_files=1)

        def _commit():
            try:
                return ("ok", txn.commit())
            except CommitConflict:
                return ("conflict", None)

        def _append():
            return (
                "app",
                fact.append(
                    spark.createDataFrame(
                        [(9, 9.0)], "k long, v double"
                    ).coalesce(1)
                ),
            )

        with ThreadPoolExecutor(2) as ex:
            fc, fa = ex.submit(_commit), ex.submit(_append)
            outcome = fc.result()[0]
            fa.result()
        # never a quarantine, never lost rows, whatever the order
        assert cat.failed_transactions() == {}
        assert "txns" not in cat._read()
        ks = sorted(r.k for r in fact.read(spark).collect())
        assert ks == [0, 1, 2, 9]
        n_files = len(fact._manifest(fact._latest_published()))
        if outcome == "ok":
            assert n_files == 2  # compacted file + the append
        else:
            assert n_files == 4  # 3 originals + the append


def test_dml_row_filter_may_reference_masked_columns(spark, tmp_path):
    """Composition pin: the ROW FILTER evaluates against unmasked rows
    (the Unity rule), so a filter referencing a MASKED column is
    legal and the DML guard conjoins it untouched — only the USER'S
    predicate/SET text is scanned for masked references."""
    cat = _policied_cat(spark, tmp_path)
    cat.set_row_filter("gov.t", "bal > 0")   # references bal...
    cat.set_column_mask("gov.t", "bal", "NULL")  # ...which is masked
    # user statement never names bal -> allowed; filter still scopes it
    cat.execute(spark, "DELETE FROM {{gov.t}} WHERE region = 'EU'")
    cat.drop_row_filter("gov.t")
    cat.drop_column_mask("gov.t", "bal")
    left = {
        (r.id, r.region)
        for r in cat.load_table("gov.t").read(spark).collect()
    }
    # EU rows with bal>0 (id=1) deleted; hidden EU row (bal<0, id=2)
    # survives; US rows untouched
    assert left == {(2, "EU"), (3, "US"), (4, "US")}


def test_execute_script_transactions(spark, tmp_path):
    """The script front-end (r10): BEGIN/COMMIT wrap INSERT INTO /
    INSERT OVERWRITE / COMPACT into one CatalogTransaction — staged
    invisibly, flipped atomically; ABORT forgets; reads inside the
    transaction see the pre-transaction state (WAP, not MVCC); a
    script ending with an open transaction aborts and raises."""
    cat = LocalCatalog(str(tmp_path))
    cat.create_namespace("db")
    fact = cat.create_table("db.fact")
    dim = cat.create_table("db.dim")
    for k in range(3):
        fact.append(
            spark.createDataFrame(
                [(k, float(k))], "k long, v double"
            ).coalesce(1)
        )
    dim.append(
        spark.createDataFrame([(0, "a")], "k long, s string").coalesce(1)
    )
    seed = cat.create_table("db.seed")
    seed.append(
        spark.createDataFrame([(1, "b"), (2, "c")], "k long, s string")
    )
    res = cat.execute_script(
        spark,
        """
        BEGIN;
        COMPACT {{db.fact}} INTO 1 FILES;
        INSERT INTO {{db.dim}} SELECT * FROM {{db.seed}};
        SELECT COUNT(*) AS n FROM {{db.dim}};
        COMMIT;
        SELECT COUNT(*) AS n FROM {{db.dim}}
        """,
    )
    # mid-txn read saw the PRE-transaction dim; post-commit sees all
    assert res[3].collect()[0]["n"] == 1
    assert res[5].collect()[0]["n"] == 3
    assert set(res[4]) == {"db.fact", "db.dim"}
    assert len(fact._manifest(fact._latest_published())) == 1
    assert sorted(r.k for r in fact.read(spark).collect()) == [0, 1, 2]
    # ABORT forgets; semicolon inside a string literal doesn't split
    res = cat.execute_script(
        spark,
        """
        BEGIN;
        INSERT INTO {{db.dim}} SELECT k, 'x;y' AS s FROM {{db.seed}};
        ABORT;
        SELECT COUNT(*) AS n FROM {{db.dim}}
        """,
    )
    assert res[-1].collect()[0]["n"] == 3
    # open transaction at EOF aborts and raises, nothing visible
    with pytest.raises(ValueError, match="OPEN transaction"):
        cat.execute_script(
            spark,
            "BEGIN; INSERT INTO {{db.dim}} SELECT * FROM {{db.seed}}",
        )
    assert cat.load_table("db.dim").read(spark).count() == 3
    assert "txns" not in cat._read()
    # guards: nested BEGIN, bare COMMIT, immediate COMPACT
    with pytest.raises(ValueError, match="nested BEGIN"):
        cat.execute_script(spark, "BEGIN; BEGIN; COMMIT")
    with pytest.raises(ValueError, match="COMMIT outside"):
        cat.execute_script(spark, "COMMIT")
    cat.execute_script(spark, "COMPACT {{db.dim}} INTO 2 FILES")
    assert (
        len(
            cat.load_table("db.dim")._manifest(
                cat.load_table("db.dim")._latest_published()
            )
        )
        == 2
    )
