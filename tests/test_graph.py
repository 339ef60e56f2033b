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
