"""Incremental materialized-view maintenance (sources/catalog_mv.py):
the parser's eligibility fence, the counting algebra (bootstrap →
append delta → retraction via CDC merge → group death → noop), every
soundness fallback (MIN/MAX over deletes, non-changelog ranges,
governance changes, definition replace), idempotent replay, and the
console REFRESH verb."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from iceberg_insert_spark.sources.catalog import LocalCatalog
from iceberg_insert_spark.sources.catalog_mv import (
    MVNotIncremental,
    parse_mv_plan,
)

from .conftest import SF_DIR


def _orders(spark):
    return spark.read.parquet(f"{SF_DIR}/orders.parquet")


def _rows(df):
    return {tuple(r) for r in df.collect()}


# ------------------------------------------------------------- parser


def test_parse_accepts_the_maintainable_fragment():
    p = parse_mv_plan(
        """
        SELECT o_orderstatus, COUNT(*) AS n,
               CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))
                    AS DOUBLE) / 100.0 AS sum_price,
               COUNT(o_clerk) AS clerks,
               MIN(o_orderdate) AS first_day
        FROM {{gold.orders}}
        WHERE o_orderpriority = '1-URGENT'
        GROUP BY o_orderstatus
        """
    )
    assert p.table == "gold.orders"
    assert p.where.strip() == "o_orderpriority = '1-URGENT'"
    assert [a.fn for a in p.aggs] == ["COUNT*", "SUM", "COUNT", "MIN"]
    assert p.order == (
        "o_orderstatus", "n", "sum_price", "clerks", "first_day",
    )
    # the fixed-point wrapper round-trips through the raw column
    s = dict((a.alias, a) for a in p.aggs)["sum_price"]
    assert s.final_sql().startswith("CAST(")
    assert "__iis_mv_agg__sum_price" in s.final_sql()


@pytest.mark.parametrize(
    "sql, why",
    [
        ("SELECT a, COUNT(*) AS n FROM {{g.t}} JOIN x GROUP BY a", "JOIN"),
        ("SELECT a, COUNT(DISTINCT b) AS n FROM {{g.t}} GROUP BY a",
         "DISTINCT"),
        ("SELECT a, AVG(DISTINCT b) AS m FROM {{g.t}} GROUP BY a",
         "DISTINCT"),
        ("SELECT a, SUM(b) AS s FROM {{g.t}} GROUP BY 1", "positional"),
        ("SELECT a, SUM(b) AS s FROM {{g.t}} WHERE c IN "
         "(SELECT d FROM e) GROUP BY a", "fragment"),
        ("SELECT a, SUM(b) AS s, SUM(c) + SUM(d) AS t FROM {{g.t}} "
         "GROUP BY a", "one aggregate"),
        ("SELECT a, SUM(b) FROM {{g.t}} GROUP BY a", "alias"),
        ("SELECT a FROM {{g.t}} GROUP BY a", "key-only"),
        ("SELECT a, b, SUM(c) AS s FROM {{g.t}} GROUP BY a",
         "GROUP BY"),
        ("SELECT a, SUM(b) AS s FROM {{g.t@3}} GROUP BY a", "pinned"),
        ("SELECT a, SUM(b) AS s FROM {{g.t}} WHERE x < RAND() "
         "GROUP BY a", "ondeterministic"),
        ("SELECT t.a AS a, SUM(u.b) AS s FROM {{g.t}} t, {{g.u}} u "
         "GROUP BY t.a", "one"),
        ("SELECT * FROM {{g.t}} GROUP BY a", "SELECT \\*"),
    ],
)
def test_parse_refuses_outside_the_fragment(sql, why):
    with pytest.raises(MVNotIncremental, match=why):
        parse_mv_plan(sql)


def test_parse_keyword_inside_string_literal_is_not_forbidden():
    # 'JOINED' appearing in a literal must not trip the JOIN fence,
    # and the literal must survive the span slicing intact
    p = parse_mv_plan(
        "SELECT a, COUNT(*) AS n FROM {{g.t}} "
        "WHERE label = 'JOINED UNION DISTINCT' GROUP BY a"
    )
    assert p.where == "label = 'JOINED UNION DISTINCT'"


# --------------------------------------------------- the counting core


MV_SQL = """
    SELECT o_orderstatus, COUNT(*) AS n_orders,
           CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))
                AS BIGINT) AS cents
    FROM {{g.orders}}
    GROUP BY o_orderstatus
"""


def _expected(src_df):
    return src_df.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(
            F.expr("CAST(ROUND(o_totalprice * 100) AS BIGINT)")
        ).alias("cents"),
    )


def test_bootstrap_then_append_then_retract_then_noop(spark, tmp_path):
    o = _orders(spark)
    cat = LocalCatalog(str(tmp_path))
    cat.create_namespace("g")
    t = cat.create_table("g.orders")
    t.append(o.filter(F.col("o_orderkey") % 4 == 0))
    cat.create_materialized_view("g.mv", MV_SQL)

    r1 = cat.refresh_materialized(spark, "g.mv", mode="incremental")
    assert r1["mode"] == "bootstrap"
    df, hit = cat.read_materialized(spark, "g.mv")
    # hidden support columns never leak through a catalog read
    assert hit and df.columns == ["o_orderstatus", "n_orders", "cents"]
    assert _rows(df) == _rows(_expected(t.read(spark)))

    # append-only delta maintains incrementally
    t.append(o.filter(F.col("o_orderkey") % 4 == 1))
    r2 = cat.refresh_materialized(spark, "g.mv", mode="incremental")
    assert r2["mode"] == "incremental" and r2["applied"]
    df, hit = cat.read_materialized(spark, "g.mv")
    assert hit
    assert _rows(df) == _rows(_expected(t.read(spark)))

    # retraction: a CDC merge deletes a slice; SUM/COUNT subtract
    chg = o.filter(F.col("o_orderkey") % 8 == 1).withColumn(
        "_op", F.lit("D")
    )
    t.merge(spark, chg, key="o_orderkey", op_col="_op")
    r3 = cat.refresh_materialized(spark, "g.mv", mode="incremental")
    assert r3["mode"] == "incremental"
    df, hit = cat.read_materialized(spark, "g.mv")
    assert hit
    assert _rows(df) == _rows(_expected(t.read(spark)))

    # nothing moved -> metadata-only noop
    assert (
        cat.refresh_materialized(spark, "g.mv", mode="incremental")[
            "mode"
        ]
        == "noop"
    )


def test_group_death_and_birth(spark, tmp_path):
    """A group whose last row is retracted disappears from storage; a
    group first seen in the delta appears — the liveness count, not a
    recompute, decides both."""
    cat = LocalCatalog(str(tmp_path))
    cat.create_namespace("g")
    t = cat.create_table("g.kv")
    t.append(
        _orders(spark)
        .limit(0)
        .select(
            F.col("o_orderkey").alias("k"),
            F.col("o_orderstatus").alias("grp"),
            F.col("o_totalprice").alias("v"),
        )
    )
    spark_df = lambda rows: (  # noqa: E731
        t.read(spark)
        .sparkSession.createDataFrame(
            rows, "k long, grp string, v double"
        )
    )
    t.append(spark_df([(1, "a", 10.0), (2, "a", 20.0), (3, "b", 5.0)]))
    cat.create_materialized_view(
        "g.mv",
        "SELECT grp, COUNT(*) AS n, SUM(CAST(ROUND(v * 100) AS BIGINT))"
        " AS cents FROM {{g.kv}} GROUP BY grp",
    )
    cat.refresh_materialized(spark, "g.mv", mode="incremental")

    # kill group b entirely, birth group c, shrink group a
    chg = spark_df(
        [(3, "b", 5.0), (2, "a", 20.0), (9, "c", 7.0)]
    ).withColumn(
        "_op",
        F.when(F.col("k") == 9, F.lit("I")).otherwise(F.lit("D")),
    )
    t.merge(spark, chg, key="k", op_col="_op")
    r = cat.refresh_materialized(spark, "g.mv", mode="incremental")
    assert r["mode"] == "incremental"
    df, hit = cat.read_materialized(spark, "g.mv")
    assert hit
    assert _rows(df) == {("a", 1, 1000), ("c", 1, 700)}


def test_sum_returns_to_null_when_last_nonnull_leaves(spark, tmp_path):
    """The per-SUM non-null contribution count: deleting the only
    non-null value must take SUM back to NULL, not 0 — the case plain
    old+delta arithmetic gets wrong."""
    cat = LocalCatalog(str(tmp_path))
    cat.create_namespace("g")
    t = cat.create_table("g.kv")
    df0 = spark.createDataFrame(
        [(1, "a", 10.0), (2, "a", None), (3, "a", None)],
        "k long, grp string, v double",
    )
    t.append(df0)
    cat.create_materialized_view(
        "g.mv",
        "SELECT grp, COUNT(*) AS n, SUM(v) AS total "
        "FROM {{g.kv}} GROUP BY grp",
    )
    cat.refresh_materialized(spark, "g.mv", mode="incremental")
    chg = spark.createDataFrame(
        [(1, "a", 10.0)], "k long, grp string, v double"
    ).withColumn("_op", F.lit("D"))
    t.merge(spark, chg, key="k", op_col="_op")
    r = cat.refresh_materialized(spark, "g.mv", mode="incremental")
    assert r["mode"] == "incremental"
    df, _ = cat.read_materialized(spark, "g.mv")
    assert _rows(df) == {("a", 2, None)}


def test_minmax_incremental_on_appends_full_on_deletes(spark, tmp_path):
    o = _orders(spark)
    cat = LocalCatalog(str(tmp_path))
    cat.create_namespace("g")
    t = cat.create_table("g.orders")
    t.append(o.filter(F.col("o_orderkey") % 4 == 0))
    cat.create_materialized_view(
        "g.mv",
        "SELECT o_orderstatus, MIN(o_totalprice) AS lo, "
        "MAX(o_totalprice) AS hi, COUNT(*) AS n "
        "FROM {{g.orders}} GROUP BY o_orderstatus",
    )
    cat.refresh_materialized(spark, "g.mv", mode="incremental")
    t.append(o.filter(F.col("o_orderkey") % 4 == 1))
    r = cat.refresh_materialized(spark, "g.mv", mode="incremental")
    assert r["mode"] == "incremental"  # insert-only range: maintained

    chg = o.filter(F.col("o_orderkey") % 8 == 0).withColumn(
        "_op", F.lit("D")
    )
    t.merge(spark, chg, key="o_orderkey", op_col="_op")
    r = cat.refresh_materialized(spark, "g.mv", mode="incremental")
    assert r["mode"] == "full_fallback"
    assert "MIN/MAX" in r["reason"]
    df, hit = cat.read_materialized(spark, "g.mv")
    cur = t.read(spark)
    exp = cur.groupBy("o_orderstatus").agg(
        F.min("o_totalprice").alias("lo"),
        F.max("o_totalprice").alias("hi"),
        F.count(F.lit(1)).alias("n"),
    )
    assert hit and _rows(df) == _rows(exp)


# ------------------------------------------------------ the fallbacks


def test_cow_delete_range_falls_back_full(spark, tmp_path):
    """Copy-on-write DELETE commits rewrite visibility wholesale — the
    changelog refuses the range and the refresh falls back, still
    producing the correct answer."""
    cat = LocalCatalog(str(tmp_path))
    cat.create_namespace("g")
    t = cat.create_table("g.orders")
    t.append(_orders(spark).limit(2000))
    cat.create_materialized_view(
        "g.mv",
        "SELECT o_orderstatus, COUNT(*) AS n FROM {{g.orders}} "
        "GROUP BY o_orderstatus",
    )
    cat.refresh_materialized(spark, "g.mv", mode="incremental")
    t.delete_where(spark, "o_orderkey % 2 = 0")
    r = cat.refresh_materialized(spark, "g.mv", mode="incremental")
    assert r["mode"] == "full_fallback"
    assert "not changelog-readable" in r["reason"]
    df, hit = cat.read_materialized(spark, "g.mv")
    exp = t.read(spark).groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n")
    )
    assert hit and _rows(df) == _rows(exp)


def test_policy_change_falls_back_and_applies_to_deltas(
    spark, tmp_path
):
    """A governance change invalidates the stored aggregates (computed
    under the old policy) — full fallback; under a CONSTANT policy the
    delta rows are policy-filtered exactly like a full read."""
    o = _orders(spark)
    cat = LocalCatalog(str(tmp_path))
    cat.create_namespace("g")
    t = cat.create_table("g.orders")
    t.append(o.limit(2000))
    cat.create_materialized_view(
        "g.mv",
        "SELECT o_orderstatus, COUNT(*) AS n FROM {{g.orders}} "
        "GROUP BY o_orderstatus",
    )
    cat.refresh_materialized(spark, "g.mv", mode="incremental")
    cat.set_row_filter("g.orders", "o_orderkey % 3 != 0")
    r = cat.refresh_materialized(spark, "g.mv", mode="incremental")
    assert r["mode"] == "full_fallback"
    assert "policy" in r["reason"]

    t.append(o.limit(3000).subtract(o.limit(2000)))
    r = cat.refresh_materialized(spark, "g.mv", mode="incremental")
    assert r["mode"] == "incremental"
    df, hit = cat.read_materialized(spark, "g.mv")
    exp = (
        t.read(spark)
        .filter("o_orderkey % 3 != 0")
        .groupBy("o_orderstatus")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    assert hit and _rows(df) == _rows(exp)


def test_definition_replace_bootstraps(spark, tmp_path):
    cat = LocalCatalog(str(tmp_path))
    cat.create_namespace("g")
    t = cat.create_table("g.orders")
    t.append(_orders(spark).limit(1000))
    cat.create_materialized_view("g.mv", MV_SQL.replace("g.orders", "g.orders"))
    cat.refresh_materialized(spark, "g.mv", mode="incremental")
    cat.create_materialized_view(
        "g.mv",
        "SELECT o_orderstatus, COUNT(*) AS n FROM {{g.orders}} "
        "GROUP BY o_orderstatus",
        replace=True,
    )
    r = cat.refresh_materialized(spark, "g.mv", mode="incremental")
    assert r["mode"] == "bootstrap"


def test_strict_raises_auto_falls_back(spark, tmp_path):
    cat = LocalCatalog(str(tmp_path))
    cat.create_namespace("g")
    t = cat.create_table("g.orders")
    t.append(_orders(spark).limit(500))
    cat.create_materialized_view(
        "g.mv",
        "SELECT o_orderstatus, COUNT(DISTINCT o_orderpriority) AS m "
        "FROM {{g.orders}} GROUP BY o_orderstatus",
    )
    with pytest.raises(MVNotIncremental, match="DISTINCT"):
        cat.refresh_materialized(spark, "g.mv", mode="incremental")
    r = cat.refresh_materialized(spark, "g.mv", mode="auto")
    assert r["mode"] == "full"  # plain full: no augmentation possible
    df, hit = cat.read_materialized(spark, "g.mv")
    assert hit and df.columns == ["o_orderstatus", "m"]


def test_avg_maintains_incrementally_and_decimal_refuses(
    spark, tmp_path
):
    """AVG auto-decomposes into SUM + count state for non-decimal
    input and recombines by guarded division (Spark's own non-decimal
    Average algebra); a DECIMAL argument refuses — Spark's decimal
    Average carries precision/scale promotion no sum/count
    recombination reproduces."""
    o = _orders(spark)
    cat = LocalCatalog(str(tmp_path))
    cat.create_namespace("g")
    t = cat.create_table("g.orders")
    t.append(o.filter(F.col("o_orderkey") % 4 == 0))
    cat.create_materialized_view(
        "g.mv",
        "SELECT o_orderstatus, AVG(o_totalprice) AS avg_price, "
        "COUNT(*) AS n FROM {{g.orders}} GROUP BY o_orderstatus",
    )
    assert (
        cat.refresh_materialized(spark, "g.mv", mode="incremental")[
            "mode"
        ]
        == "bootstrap"
    )
    t.append(o.filter(F.col("o_orderkey") % 4 == 1))
    r = cat.refresh_materialized(spark, "g.mv", mode="incremental")
    assert r["mode"] == "incremental"
    chg = o.filter(F.col("o_orderkey") % 8 == 1).withColumn(
        "_op", F.lit("D")
    )
    t.merge(spark, chg, key="o_orderkey", op_col="_op")
    r = cat.refresh_materialized(spark, "g.mv", mode="incremental")
    assert r["mode"] == "incremental"
    df, hit = cat.read_materialized(spark, "g.mv")
    assert hit
    exp = t.read(spark).groupBy("o_orderstatus").agg(
        F.avg("o_totalprice").alias("avg_price"),
        F.count(F.lit(1)).alias("n"),
    )
    got = {r2["o_orderstatus"]: r2 for r2 in df.collect()}
    for e in exp.collect():
        g = got[e["o_orderstatus"]]
        assert g["n"] == e["n"]
        assert g["avg_price"] == pytest.approx(
            e["avg_price"], rel=1e-12
        )

    # decimal argument: eligibility probe refuses by type
    t2 = cat.create_table("g.dec")
    t2.append(
        o.limit(100).select(
            "o_orderstatus",
            F.expr(
                "CAST(o_totalprice AS DECIMAL(12,2))"
            ).alias("price_dec"),
        )
    )
    cat.create_materialized_view(
        "g.mv_dec",
        "SELECT o_orderstatus, AVG(price_dec) AS m "
        "FROM {{g.dec}} GROUP BY o_orderstatus",
    )
    with pytest.raises(MVNotIncremental, match="DECIMAL"):
        cat.refresh_materialized(spark, "g.mv_dec", mode="incremental")
    r = cat.refresh_materialized(spark, "g.mv_dec", mode="auto")
    assert r["mode"] == "full"


def test_replay_is_idempotent(spark, tmp_path):
    """Crash between the storage merge and the freshness record: the
    re-run replays the same range and the merge token dedupes — no
    double-applied delta."""
    o = _orders(spark)
    cat = LocalCatalog(str(tmp_path))
    cat.create_namespace("g")
    t = cat.create_table("g.orders")
    t.append(o.filter(F.col("o_orderkey") % 2 == 0))
    cat.create_materialized_view("g.mv", MV_SQL)
    cat.refresh_materialized(spark, "g.mv", mode="incremental")
    t.append(o.filter(F.col("o_orderkey") % 2 == 1))
    r = cat.refresh_materialized(spark, "g.mv", mode="incremental")
    assert r["mode"] == "incremental"
    # simulate the crash: freshness never recorded
    with cat._lock():
        reg = cat._read()
        reg["views"]["g.mv"]["freshness"]["deps"]["g.orders"] = r["from"]
        cat._write(reg)
    r2 = cat.refresh_materialized(spark, "g.mv", mode="incremental")
    assert r2["mode"] == "incremental"
    df, hit = cat.read_materialized(spark, "g.mv")
    assert hit and _rows(df) == _rows(_expected(t.read(spark)))


# --------------------------------------------------------- the console


def test_refresh_verb_and_txn_refusal(spark, tmp_path):
    cat = LocalCatalog(str(tmp_path))
    cat.create_namespace("g")
    t = cat.create_table("g.orders")
    t.append(_orders(spark).limit(1000))
    cat.create_materialized_view("g.mv", MV_SQL)
    assert cat.execute(spark, "REFRESH {{g.mv}}")["mode"] == "bootstrap"
    t.append(_orders(spark).limit(1500).subtract(_orders(spark).limit(1000)))
    assert (
        cat.execute(spark, "REFRESH {{g.mv}} INCREMENTAL")["mode"]
        == "incremental"
    )
    assert cat.execute(spark, "REFRESH {{g.mv}} FULL")["mode"] == "full"
    with pytest.raises(ValueError, match="expected 'REFRESH"):
        cat.execute(spark, "REFRESH g.mv")
    with pytest.raises(ValueError, match="REFRESH inside BEGIN"):
        cat.execute_script(spark, "BEGIN; REFRESH {{g.mv}}; COMMIT")


def test_refresh_reads_only_the_delta_files(spark, tmp_path):
    """The O(churn) claim, pinned structurally: after the bootstrap, an
    incremental refresh of a 9-file base with a 1-file delta reads the
    changelog's manifest set-difference — the base's untouched files
    never enter the delta frame's plan (their count stays out of the
    delta aggregate's input)."""
    o = _orders(spark)
    cat = LocalCatalog(str(tmp_path))
    cat.create_namespace("g")
    t = cat.create_table("g.orders")
    for i in range(9):
        t.append(o.filter(F.col("o_orderkey") % 9 == i))
    cat.create_materialized_view("g.mv", MV_SQL)
    cat.refresh_materialized(spark, "g.mv", mode="incremental")
    before = set(t._manifest(t._latest_published()))
    t.append(o.limit(50))
    from iceberg_insert_spark.sources.snapshots.incremental import (
        read_changelog,
    )

    ch = read_changelog(
        t, spark, t._latest_published() - 1, t._latest_published()
    )
    # the delta the refresh aggregates is exactly the new files' rows
    assert ch.count() == 50
    after = set(t._manifest(t._latest_published()))
    assert len(after - before) == 1  # one delta file for the range
    r = cat.refresh_materialized(spark, "g.mv", mode="incremental")
    assert r["mode"] == "incremental"
    df, hit = cat.read_materialized(spark, "g.mv")
    assert hit and _rows(df) == _rows(_expected(t.read(spark)))


# ---------------------------------------------- the staged r13 query


def test_q_catalog_mv_inc_oracle_row(spark, ddb):
    """q_catalog_mv_inc (staged for r13 registration) against its
    DuckDB oracle at the suite's SF — the same driver-rule compare the
    registry check will run: final MV content equals the plain
    recomputation over surviving rows, AND the refresh modes hashed
    into the result prove the delta path (not a silent full recompute)
    produced it."""
    from iceberg_insert_spark.sources.catalog import (
        CATALOG_MV_INC_ORACLE,
        q_catalog_mv_inc,
    )

    from .conftest import compare_frames

    df = q_catalog_mv_inc(spark, SF_DIR)
    cur = ddb.execute(CATALOG_MV_INC_ORACLE)
    compare_frames(df, cur.fetchall(), [d[0] for d in cur.description])


# ----------------------------------------- review-wave regression pins


def test_bare_clock_keywords_are_refused():
    """Spark accepts current_date / current_timestamp WITHOUT parens;
    a rolling-window MV built on them would pass a paren-anchored
    fence and then silently diverge (rows aging out of the window are
    never retracted by any delta)."""
    for kw in ("current_date", "CURRENT_TIMESTAMP", "localtimestamp"):
        with pytest.raises(MVNotIncremental, match="nondeterministic"):
            parse_mv_plan(
                f"SELECT a, COUNT(*) AS n FROM {{{{g.t}}}} "
                f"WHERE d >= {kw} - INTERVAL 30 DAYS GROUP BY a"
            )


def test_crash_replay_with_moved_head_no_double_apply(spark, tmp_path):
    """The write-ahead intent: a crash between the storage merge and
    the freshness record, followed by MORE base commits, must replay
    the pending range (token no-op) and then catch up — deriving one
    big range instead would re-apply the landed window with a fresh
    token and double-count it."""
    o = _orders(spark)
    cat = LocalCatalog(str(tmp_path))
    cat.create_namespace("g")
    t = cat.create_table("g.orders")
    t.append(o.filter(F.col("o_orderkey") % 4 == 0))
    cat.create_materialized_view("g.mv", MV_SQL)
    cat.refresh_materialized(spark, "g.mv", mode="incremental")

    t.append(o.filter(F.col("o_orderkey") % 4 == 1))
    r = cat.refresh_materialized(spark, "g.mv", mode="incremental")
    assert r["mode"] == "incremental"
    # simulate the crash: merge landed, freshness write never ran —
    # restore deps to the pre-refresh head and leave the intent behind
    with cat._lock():
        reg = cat._read()
        fr = reg["views"]["g.mv"]["freshness"]
        pend_deps = dict(fr["deps"])
        fr["deps"] = dict(fr["deps"], **{"g.orders": r["from"]})
        fr["pending"] = {
            "from": r["from"],
            "to": r["to"],
            "deps": pend_deps,
        }
        cat._write(reg)
    # the head moves past the crashed range
    t.append(o.filter(F.col("o_orderkey") % 4 == 2))
    r2 = cat.refresh_materialized(spark, "g.mv", mode="incremental")
    assert r2["mode"] == "incremental"
    assert r2["from"] == r["to"]  # the catch-up range, after replay
    df, hit = cat.read_materialized(spark, "g.mv")
    assert hit
    assert _rows(df) == _rows(_expected(t.read(spark)))
    # the intent is gone
    fr = cat._read()["views"]["g.mv"]["freshness"]
    assert "pending" not in fr


def test_bootstrap_pins_the_recorded_dep_version(spark, tmp_path):
    """augmented_aggregate(as_of=v) reads snapshot v, not the head:
    the bootstrap records deps BEFORE computing, so a commit landing
    in between must leave storage at the RECORDED version (stale but
    correct) — aggregating the newer head would make the next
    incremental refresh double-apply the gap."""
    from iceberg_insert_spark.sources.catalog_mv import (
        augmented_aggregate,
    )

    o = _orders(spark)
    cat = LocalCatalog(str(tmp_path))
    cat.create_namespace("g")
    t = cat.create_table("g.orders")
    t.append(o.filter(F.col("o_orderkey") % 4 == 0))
    v1 = t._latest_published()
    t.append(o.filter(F.col("o_orderkey") % 4 == 1))
    plan = parse_mv_plan(MV_SQL)
    pinned = augmented_aggregate(cat, spark, plan, as_of=v1)
    n_pinned = pinned.agg(F.sum("n_orders")).collect()[0][0]
    assert n_pinned == o.filter(F.col("o_orderkey") % 4 == 0).count()


def test_crash_replay_of_a_retraction_recovers(spark, tmp_path):
    """Second review wave: replaying a pending range whose merge
    ALREADY landed must consult the storage token index and finish the
    bookkeeping — recomputing the delta against post-merge storage
    reads an already-applied retraction as a negative liveness count
    and wedges every subsequent refresh on the consistency probe."""
    cat = LocalCatalog(str(tmp_path))
    cat.create_namespace("g")
    t = cat.create_table("g.kv")
    t.append(
        spark.createDataFrame(
            [(1, "a", 10.0), (2, "b", 5.0)], "k long, grp string, v double"
        )
    )
    cat.create_materialized_view(
        "g.mv",
        "SELECT grp, COUNT(*) AS n, SUM(CAST(ROUND(v * 100) AS BIGINT))"
        " AS cents FROM {{g.kv}} GROUP BY grp",
    )
    cat.refresh_materialized(spark, "g.mv", mode="incremental")
    # CDC-delete group b entirely, refresh (merge lands), then undo
    # the freshness write to simulate the crash-after-merge
    chg = spark.createDataFrame(
        [(2, "b", 5.0)], "k long, grp string, v double"
    ).withColumn("_op", F.lit("D"))
    t.merge(spark, chg, key="k", op_col="_op")
    r = cat.refresh_materialized(spark, "g.mv", mode="incremental")
    assert r["mode"] == "incremental"
    with cat._lock():
        reg = cat._read()
        fr = reg["views"]["g.mv"]["freshness"]
        pend_deps = dict(fr["deps"])
        fr["deps"] = dict(fr["deps"], **{"g.kv": r["from"]})
        fr["pending"] = {
            "from": r["from"], "to": r["to"], "deps": pend_deps,
        }
        cat._write(reg)
    r2 = cat.refresh_materialized(spark, "g.mv", mode="incremental")
    assert r2["mode"] in ("incremental", "noop")
    df, hit = cat.read_materialized(spark, "g.mv")
    assert hit and _rows(df) == {("a", 1, 1000)}
    assert "pending" not in cat._read()["views"]["g.mv"]["freshness"]


def test_nonnumeric_sum_avg_args_refuse(spark, tmp_path):
    """Spark's Sum/Average implicitly cast non-numeric args and skip
    cast-nulled values AFTER the maintained non-null count saw them
    (AVG('10','abc') would divide by 2 where Spark divides by 1) —
    the type probe refuses both."""
    cat = LocalCatalog(str(tmp_path))
    cat.create_namespace("g")
    t = cat.create_table("g.s")
    # castable values — the refusal is TYPE-based (an 'abc' here would
    # also blow up the plain full refresh under ANSI, which is Spark's
    # own behavior and not this module's concern)
    t.append(
        spark.createDataFrame(
            [("a", "10"), ("a", "20")], "grp string, sval string"
        )
    )
    for fn in ("AVG", "SUM"):
        cat.create_materialized_view(
            "g.mv_s",
            f"SELECT grp, {fn}(sval) AS m, COUNT(*) AS n "
            "FROM {{g.s}} GROUP BY grp",
            replace=True,
        )
        with pytest.raises(MVNotIncremental, match="non-numeric"):
            cat.refresh_materialized(spark, "g.mv_s", mode="incremental")
        assert (
            cat.refresh_materialized(spark, "g.mv_s", mode="auto")["mode"]
            == "full"
        )


def test_unix_timestamp_forms():
    """Zero-arg UNIX_TIMESTAMP() reads the clock (refused); the 1/2-arg
    forms are deterministic string->epoch parses (eligible)."""
    with pytest.raises(MVNotIncremental, match="UNIX_TIMESTAMP"):
        parse_mv_plan(
            "SELECT a, COUNT(*) AS n FROM {{g.t}} "
            "WHERE ts < UNIX_TIMESTAMP() GROUP BY a"
        )
    p = parse_mv_plan(
        "SELECT a, COUNT(*) AS n FROM {{g.t}} "
        "WHERE UNIX_TIMESTAMP(evt, 'yyyy-MM-dd') > 100 GROUP BY a"
    )
    assert "UNIX_TIMESTAMP(evt" in p.where


# ------------------------------------------------------------- HAVING


def test_having_filters_at_read_and_groups_cross_threshold(
    spark, tmp_path
):
    """HAVING over an incrementally-maintained MV: storage keeps ALL
    groups, the translated predicate applies at read time — so a delta
    can move a group below the threshold (it vanishes from reads) and
    back above (it reappears), which a filtered store could not
    represent."""
    cat = LocalCatalog(str(tmp_path))
    cat.create_namespace("g")
    t = cat.create_table("g.kv")
    mk = lambda rows: spark.createDataFrame(  # noqa: E731
        rows, "k long, grp string, v double"
    )
    t.append(mk([(1, "a", 10.0), (2, "a", 20.0), (3, "b", 5.0)]))
    cat.create_materialized_view(
        "g.mv",
        "SELECT grp, COUNT(*) AS n, SUM(CAST(ROUND(v * 100) AS BIGINT))"
        " AS cents FROM {{g.kv}} GROUP BY grp"
        " HAVING COUNT(*) > 1",
    )
    r = cat.refresh_materialized(spark, "g.mv", mode="incremental")
    assert r["mode"] == "bootstrap"
    df, hit = cat.read_materialized(spark, "g.mv")
    assert hit and df.columns == ["grp", "n", "cents"]
    assert _rows(df) == {("a", 2, 3000)}  # b fails HAVING
    # live fallback agrees with the storage-served answer
    assert _rows(cat.read_view(spark, "g.mv")) == {("a", 2, 3000)}

    # delta pushes b ABOVE the threshold and a BELOW it
    chg = mk([(2, "a", 20.0), (9, "b", 7.0)]).withColumn(
        "_op", F.when(F.col("k") == 9, F.lit("I")).otherwise(F.lit("D"))
    )
    t.merge(spark, chg, key="k", op_col="_op")
    r = cat.refresh_materialized(spark, "g.mv", mode="incremental")
    assert r["mode"] == "incremental"
    df, hit = cat.read_materialized(spark, "g.mv")
    assert hit and _rows(df) == {("b", 2, 1200)}
    # the same serve through the SQL front-end's MV resolution
    got = cat.sql(
        spark, "SELECT grp, n FROM {{g.mv}} ORDER BY grp"
    ).collect()
    assert [(x.grp, x.n) for x in got] == [("b", 2)]


def test_having_alias_and_avg_translation(spark, tmp_path):
    """Alias references pass through; an AVG call in HAVING translates
    to the maintained sum/count recombination."""
    cat = LocalCatalog(str(tmp_path))
    cat.create_namespace("g")
    t = cat.create_table("g.kv")
    t.append(
        spark.createDataFrame(
            [(1, "a", 10.0), (2, "a", 30.0), (3, "b", 100.0)],
            "k long, grp string, v double",
        )
    )
    cat.create_materialized_view(
        "g.mv",
        "SELECT grp, COUNT(*) AS n, AVG(v) AS m FROM {{g.kv}} "
        "GROUP BY grp HAVING n >= 1 AND AVG(v) < 50.0",
    )
    cat.refresh_materialized(spark, "g.mv", mode="incremental")
    df, hit = cat.read_materialized(spark, "g.mv")
    assert hit
    assert {(r.grp, r.n, r.m) for r in df.collect()} == {("a", 2, 20.0)}


def test_having_unselected_aggregate_refuses(spark, tmp_path):
    cat = LocalCatalog(str(tmp_path))
    cat.create_namespace("g")
    t = cat.create_table("g.orders")
    t.append(_orders(spark).limit(500))
    cat.create_materialized_view(
        "g.mv",
        "SELECT o_orderstatus, COUNT(*) AS n FROM {{g.orders}} "
        "GROUP BY o_orderstatus HAVING MAX(o_totalprice) > 10",
    )
    with pytest.raises(MVNotIncremental, match="not a selected"):
        cat.refresh_materialized(spark, "g.mv", mode="incremental")
    # auto: plain full refresh, HAVING applied by the live compute
    r = cat.refresh_materialized(spark, "g.mv", mode="auto")
    assert r["mode"] == "full"
    df, hit = cat.read_materialized(spark, "g.mv")
    assert hit
    assert _rows(df) == _rows(cat.read_view(spark, "g.mv"))


def test_concurrent_refreshes_converge(spark, tmp_path):
    """Three refreshers race on one delta: the in-lock intent write
    admits one deriver at a time, losers retry against the advanced
    record (raced -> recurse), the shared range token collapses any
    doubled merge — nobody throws, nothing double-applies, no intent
    is left behind."""
    from concurrent.futures import ThreadPoolExecutor

    o = _orders(spark)
    root = str(tmp_path)
    cat = LocalCatalog(root)
    cat.create_namespace("g")
    t = cat.create_table("g.orders")
    t.append(o.filter(F.col("o_orderkey") % 4 == 0))
    cat.create_materialized_view("g.mv", MV_SQL)
    cat.refresh_materialized(spark, "g.mv", mode="incremental")
    t.append(o.filter(F.col("o_orderkey") % 4 == 1))

    def worker(_i):
        # a separate catalog handle per racer, like separate clients
        return LocalCatalog(root).refresh_materialized(
            spark, "g.mv", mode="incremental"
        )

    with ThreadPoolExecutor(max_workers=3) as ex:
        results = list(ex.map(worker, range(3)))
    assert all(
        r["mode"] in ("incremental", "noop", "full_fallback")
        for r in results
    ), results
    # at least one racer did the work
    assert any(r["mode"] == "incremental" for r in results), results
    df, hit = cat.read_materialized(spark, "g.mv")
    assert hit
    assert _rows(df) == _rows(_expected(t.read(spark)))
    assert "pending" not in cat._read()["views"]["g.mv"]["freshness"]


def test_having_fences_from_third_review(spark, tmp_path):
    """Third review wave pins: (a) ORDER BY refuses instead of being
    swallowed into the HAVING capture; (b) a HAVING over a group-key
    EXPRESSION (not a storage column) refuses at REFRESH time instead
    of crashing every fresh read; (c) aggregate signatures differing
    only by string-literal case do NOT bind to each other's maintained
    state."""
    with pytest.raises(MVNotIncremental, match="ORDER"):
        parse_mv_plan(
            "SELECT a, COUNT(*) AS n FROM {{g.t}} GROUP BY a "
            "HAVING COUNT(*) > 1 ORDER BY a"
        )
    # literal-case: the HAVING aggregate is NOT the selected one
    with pytest.raises(MVNotIncremental, match="not a selected"):
        parse_mv_plan(
            "SELECT g, SUM(CASE WHEN c = 'a' THEN v END) AS s "
            "FROM {{g.t}} GROUP BY g "
            "HAVING SUM(CASE WHEN c = 'A' THEN v END) > 0"
        )
    # matching literal case binds fine
    p = parse_mv_plan(
        "SELECT g, SUM(CASE WHEN c = 'a' THEN v END) AS s "
        "FROM {{g.t}} GROUP BY g "
        "HAVING SUM(CASE WHEN c = 'a' THEN v END) > 0"
    )
    assert p.having_storage == "`__iis_mv_agg__s` > 0"

    # (b) needs the schema probe: group-key expression in HAVING
    cat = LocalCatalog(str(tmp_path))
    cat.create_namespace("g")
    t = cat.create_table("g.kv")
    t.append(
        spark.createDataFrame(
            [(1, "a", 1.0)], "k long, c string, v double"
        )
    )
    cat.create_materialized_view(
        "g.mv",
        "SELECT UPPER(c) AS u, COUNT(*) AS n FROM {{g.kv}} "
        "GROUP BY UPPER(c) HAVING UPPER(c) = 'A'",
    )
    with pytest.raises(MVNotIncremental, match="storage column"):
        cat.refresh_materialized(spark, "g.mv", mode="incremental")
    r = cat.refresh_materialized(spark, "g.mv", mode="auto")
    assert r["mode"] == "full"
    df, hit = cat.read_materialized(spark, "g.mv")
    assert hit and _rows(df) == {("A", 1)}
    # alias form IS maintainable, same semantics
    cat.create_materialized_view(
        "g.mv2",
        "SELECT UPPER(c) AS u, COUNT(*) AS n FROM {{g.kv}} "
        "GROUP BY UPPER(c) HAVING u = 'A'",
    )
    assert (
        cat.refresh_materialized(spark, "g.mv2", mode="incremental")[
            "mode"
        ]
        == "bootstrap"
    )
    df, hit = cat.read_materialized(spark, "g.mv2")
    assert hit and _rows(df) == {("A", 1)}


def test_apply_range_toctou_reprobe_recovers(spark, tmp_path):
    """Direct _apply_range on a state where the range's merge ALREADY
    landed (the landed-probe TOCTOU): the negative-liveness probe must
    re-check the token index and finish the bookkeeping instead of
    raising the consistency error."""
    from iceberg_insert_spark.sources import catalog_mv as CM

    cat = LocalCatalog(str(tmp_path))
    cat.create_namespace("g")
    t = cat.create_table("g.kv")
    t.append(
        spark.createDataFrame(
            [(1, "a", 10.0), (2, "b", 5.0)], "k long, grp string, v double"
        )
    )
    cat.create_materialized_view(
        "g.mv",
        "SELECT grp, COUNT(*) AS n, SUM(CAST(ROUND(v * 100) AS BIGINT))"
        " AS cents FROM {{g.kv}} GROUP BY grp",
    )
    cat.refresh_materialized(spark, "g.mv", mode="incremental")
    chg = spark.createDataFrame(
        [(2, "b", 5.0)], "k long, grp string, v double"
    ).withColumn("_op", F.lit("D"))
    t.merge(spark, chg, key="k", op_col="_op")
    r = cat.refresh_materialized(spark, "g.mv", mode="incremental")
    assert r["mode"] == "incremental"
    # storage is POST-merge; call _apply_range for the SAME range as
    # a racer that probed landed=False just before the winner landed
    ent = cat._view_entry("g.mv")
    plan = parse_mv_plan(ent["versions"][-1]["sql"])
    res = CM._apply_range(
        cat,
        spark,
        "g.mv",
        plan,
        defn_v=len(ent["versions"]),
        from_v=r["from"],
        to_v=r["to"],
        deps_rec=r["deps"],
        reg=cat._read(),
    )
    assert res["mode"] == "incremental"
    df, hit = cat.read_materialized(spark, "g.mv")
    assert hit and _rows(df) == {("a", 1, 1000)}


def test_describe_view_surfaces_mv_state(spark, tmp_path):
    """DESCRIBE on a view/MV: kind + definition for plain views; for
    MVs the freshness verdict, augmented flag, recorded read filter,
    pending intent, and the incremental-maintainability verdict (the
    exact refusal reason for ineligible definitions)."""
    cat = LocalCatalog(str(tmp_path))
    cat.create_namespace("g")
    t = cat.create_table("g.kv")
    t.append(
        spark.createDataFrame(
            [(1, "a", 1.0), (2, "a", 2.0)], "k long, grp string, v double"
        )
    )
    cat.create_view("g.v", "SELECT grp FROM {{g.kv}}")
    d = {r.col_name: r.info for r in cat.execute(
        spark, "DESCRIBE {{g.v}}"
    ).collect()}
    assert d["kind"] == "view" and "storage" not in d

    cat.create_materialized_view(
        "g.mv",
        "SELECT grp, COUNT(*) AS n FROM {{g.kv}} GROUP BY grp "
        "HAVING COUNT(*) > 1",
    )
    d = {r.col_name: r.info for r in cat.execute(
        spark, "DESCRIBE {{g.mv}}"
    ).collect()}
    assert d["kind"] == "materialized_view"
    assert d["freshness"] == "stale" and d["last_refreshed"] == "(never)"
    assert d["incremental_maintenance"].startswith("eligible")
    cat.refresh_materialized(spark, "g.mv", mode="incremental")
    d = {r.col_name: r.info for r in cat.execute(
        spark, "DESCRIBE {{g.mv}}"
    ).collect()}
    assert d["freshness"] == "fresh"
    assert d["augmented_storage"] == "True"
    assert d["read_filter"] == "`__iis_mv_agg__n` > 1"
    assert d["pending_intent"] == "(none)"

    cat.create_materialized_view(
        "g.mv_avgdec",
        "SELECT grp, COUNT(DISTINCT k) AS n FROM {{g.kv}} GROUP BY grp",
    )
    d = {r.col_name: r.info for r in cat.execute(
        spark, "DESCRIBE {{g.mv_avgdec}}"
    ).collect()}
    assert d["incremental_maintenance"].startswith("full-refresh only:")
    assert "DISTINCT" in d["incremental_maintenance"]


def test_describe_view_dangling_and_refresh_fence_parity(
    spark, tmp_path
):
    """Fourth-wave pins: DESCRIBE on an MV with a dropped dependency
    reports DANGLING instead of crashing; the maintainability verdict
    runs the refresh-time type fences, not parse alone (a decimal AVG
    must read full-refresh-only); dependencies show the transitive
    TABLES the freshness verdict is computed from."""
    o = _orders(spark)
    cat = LocalCatalog(str(tmp_path))
    cat.create_namespace("g")
    t = cat.create_table("g.dec")
    t.append(
        o.limit(50).select(
            "o_orderstatus",
            F.expr("CAST(o_totalprice AS DECIMAL(12,2))").alias("d"),
        )
    )
    cat.create_materialized_view(
        "g.mv",
        "SELECT o_orderstatus, AVG(d) AS m FROM {{g.dec}} "
        "GROUP BY o_orderstatus",
    )
    d = {r.col_name: r.info for r in cat.execute(
        spark, "DESCRIBE {{g.mv}}"
    ).collect()}
    assert d["incremental_maintenance"].startswith("full-refresh only:")
    assert "DECIMAL" in d["incremental_maintenance"]

    # MV over a VIEW over a table: dependencies list the TABLE
    cat.create_view("g.v", "SELECT o_orderstatus FROM {{g.dec}}")
    cat.create_materialized_view(
        "g.mv2",
        "SELECT o_orderstatus, COUNT(*) AS n FROM {{g.v}} "
        "GROUP BY o_orderstatus",
    )
    d = {r.col_name: r.info for r in cat.execute(
        spark, "DESCRIBE {{g.mv2}}"
    ).collect()}
    assert d["dependencies"] == "g.dec"

    # dangling: drop the base table out from under both MVs
    cat.drop_table("g.dec")
    d = {r.col_name: r.info for r in cat.execute(
        spark, "DESCRIBE {{g.mv}}"
    ).collect()}
    assert d["dependencies"].startswith("DANGLING:")
    assert d["freshness"] == "unknown (dangling dependency)"
