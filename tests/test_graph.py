"""Triangle counting: algorithm pinned on hand-built graphs (the oracle
query cross-checks the modular fixture; these pin edge cases the fixture
can't guarantee to hit)."""

from iceberg_insert_spark.operators.graph import triangle_stats


def _stats(spark, edges):
    df = spark.createDataFrame(edges, "a long, b long")
    return triangle_stats(df).collect()[0]


def test_k4_plus_pendant(spark):
    # K4 = 4 triangles, 6 edges; pendant node adds an edge, no triangle
    k4 = [(i, j) for i in range(4) for j in range(i + 1, 4)]
    r = _stats(spark, k4 + [(3, 9)])
    assert (r.n_nodes, r.n_edges, r.n_triangles) == (5, 7, 4)


def test_duplicates_loops_and_orientation_ignored(spark):
    # same triangle given twice, reversed, with a self-loop: counted once
    r = _stats(spark, [(1, 2), (2, 1), (2, 3), (1, 3), (3, 1), (2, 2)])
    assert (r.n_nodes, r.n_edges, r.n_triangles) == (3, 3, 1)
    assert abs(r.clustering - 1.0) < 1e-9


def test_triangle_free(spark):
    # star graph: wedges but zero triangles -> clustering 0
    r = _stats(spark, [(0, i) for i in range(1, 6)])
    assert r.n_triangles == 0 and r.clustering == 0.0


def test_skewed_hub(spark):
    # hub connected to everyone + one chord: exactly the hub-skew shape
    # degree-ordering exists for; triangles = chords through the hub
    edges = [(0, i) for i in range(1, 30)] + [(5, 6), (17, 18)]
    r = _stats(spark, edges)
    assert r.n_triangles == 2


def test_common_neighbors_matches_bruteforce(spark):
    """q_graph_common_neighbors vs a pure-Python recount of the same
    definition (hub-capped pivots, non-edges only, exact ppm floor)."""
    from collections import defaultdict

    from iceberg_insert_spark.operators.graph import (
        _HUB,
        _N,
        q_graph_common_neighbors,
    )
    from .conftest import SF_DIR

    keys = [
        r.o_orderkey
        for r in spark.read.parquet(f"{SF_DIR}/orders.parquet")
        .select("o_orderkey")
        .collect()
    ]
    edges = set()
    for k in keys:
        u, v = k % _N, (k // 7) % _N
        if u != v:
            edges.add((min(u, v), max(u, v)))
    nbrs = defaultdict(set)
    for a, b in edges:
        nbrs[a].add(b)
        nbrs[b].add(a)
    cn = defaultdict(int)
    for x, ns in nbrs.items():
        if len(ns) > _HUB:
            continue
        ns = sorted(ns)
        for i in range(len(ns)):
            for j in range(i + 1, len(ns)):
                cn[(ns[i], ns[j])] += 1
    scored = []
    for (u, w), c in cn.items():
        if (u, w) in edges:
            continue
        ppm = (1000000 * c) // (len(nbrs[u]) + len(nbrs[w]) - c)
        scored.append((-ppm, -c, u, w))
    scored.sort()
    want = [(u, w, -nc, -nppm) for nppm, nc, u, w in scored[:100]]
    got = [
        (r.u, r.w, r.cn, r.jaccard_ppm)
        for r in q_graph_common_neighbors(spark, SF_DIR).collect()
    ]
    assert got == want


def test_ewma_is_bit_exact(spark):
    """q_ts_ewma's dyadic-exactness claim: the Spark double equals a
    pure-Python Fraction recomputation EXACTLY (==, no tolerance)."""
    from collections import defaultdict
    from fractions import Fraction

    from iceberg_insert_spark.operators.windows import q_ts_ewma
    from .conftest import SF_DIR

    daily = defaultdict(int)
    for r in (
        spark.read.parquet(f"{SF_DIR}/events.parquet")
        .selectExpr("event_type", "CAST(ts AS DATE) AS d")
        .collect()
    ):
        daily[(r.event_type, r.d)] += 1
    rows = q_ts_ewma(spark, SF_DIR).collect()
    assert rows
    by_type = defaultdict(dict)
    for (et, d), c in daily.items():
        by_type[et][d] = c
    for r in rows:
        import datetime

        t = datetime.date.fromisoformat(r.day)
        series = by_type[r.event_type]
        exact = sum(
            Fraction(c, 2 ** (t - d).days)
            for d, c in series.items()
            if 0 <= (t - d).days <= 29
        )
        n_terms = sum(1 for d in series if 0 <= (t - d).days <= 29)
        assert r.n_terms == n_terms
        assert Fraction(r.ewma) == exact, (r.event_type, r.day)


def test_autocorr_bigint_cast_fails_loudly_on_overflow(spark):
    """q_ts_autocorr's exactness contract says the DECIMAL(38,0)->BIGINT
    cast of acf_num/acf_den FAILS past 2^63 in both engines. Non-ANSI
    Spark silently NULLs that cast, so the operator guards it with a
    raise_error null-check (advisor catch, r6) — pin the guard pattern:
    an in-range sum casts cleanly, an over-2^63 sum raises."""
    import pytest
    from pyspark.sql import functions as F

    def loud_bigint(col, name):
        b = col.try_cast("bigint")
        return (
            F.when(
                col.isNotNull() & b.isNull(),
                F.raise_error(
                    F.lit(f"{name} overflows BIGINT (exceeds 2^63)")
                ).cast("bigint"),
            )
            .otherwise(b)
            .alias(name)
        )

    big = spark.range(2).select(
        F.lit(2**62).cast("decimal(38,0)").alias("c")
    )
    # 2 * 2^62 = 2^63: one past BIGINT max — must raise, not NULL
    with pytest.raises(Exception, match="overflows BIGINT"):
        big.agg(loud_bigint(F.sum("c"), "acf_den")).collect()
    ok = spark.range(2).select(
        F.lit(2**61).cast("decimal(38,0)").alias("c")
    )
    [row] = ok.agg(loud_bigint(F.sum("c"), "acf_den")).collect()
    assert row.acf_den == 2**62
