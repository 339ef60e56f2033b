"""Graph analytics beyond the dedup suite's connected components and
PageRank (llm/dedup.py): triangle counting with the degree-ordered
algorithm — the third classic distributed-graph primitive a curation
pipeline reaches for (community density, spam-farm detection, clustering
coefficients over near-dup graphs).

The graph is derived DETERMINISTICALLY from orders with modular
arithmetic (node ids ``o_orderkey % N`` and ``(o_orderkey div 7) % N``),
so the identical edge set is expressible in the DuckDB oracle — which
counts triangles the naive way (3-way self-join with a < b < c) while
the Spark side runs the scalable degree-ordered plan. Agreement proves
the ordering trick loses/duplicates nothing.

Scale design (Schank's forward algorithm, the shape GraphX/Trino use):
orient every undirected edge from its LOWER-(degree, id)-ranked endpoint
to the higher one. Every triangle then has exactly ONE pivot node with
two out-edges, so it is counted exactly once — and, crucially, the
out-degree of any node is bounded by O(sqrt(|E|)) regardless of how
skewed the raw degree distribution is, which caps the 2-path blowup the
naive self-join suffers on hub nodes (a celebrity node with degree 10^6
would otherwise generate 10^12 wedge candidates on one executor).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ..tables import load_table

_N = 3000  # modular node-space size: ~15k edges / ~3k nodes at sf0.01

# The ONE edge derivation every graph query and its oracle share — a
# change here re-synchronizes all Spark sides and SQL oracles at once.
_EDGES_SQL = f"""e AS (
        SELECT DISTINCT
            LEAST(o_orderkey % {_N}, (o_orderkey // 7) % {_N}) AS a,
            GREATEST(o_orderkey % {_N}, (o_orderkey // 7) % {_N}) AS b
        FROM orders
        WHERE o_orderkey % {_N} <> (o_orderkey // 7) % {_N}
    )"""
_ADJ_SQL = """adj AS (
        SELECT a AS n, b AS m FROM e
        UNION ALL SELECT b AS n, a AS m FROM e
    )"""


def _edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The deterministic modular edge set (canonical a < b, deduped)."""
    o = load_table(spark, sf_dir, "orders").select("o_orderkey")
    u = (F.col("o_orderkey") % _N).cast("long")
    v = (F.expr("o_orderkey div 7") % _N).cast("long")
    return (
        o.filter(u != v)
        .select(F.least(u, v).alias("a"), F.greatest(u, v).alias("b"))
        .distinct()
    )


def _adjacency(e: DataFrame) -> DataFrame:
    """Both directions of an undirected canonical edge frame."""
    return e.select(F.col("a").alias("n"), F.col("b").alias("m")).unionAll(
        e.select(F.col("b").alias("n"), F.col("a").alias("m"))
    )



@query(
    "q_graph_triangles",
    oracle=f"""
    WITH {_EDGES_SQL},
    deg AS (
        SELECT n, COUNT(*) AS d
        FROM (SELECT a AS n FROM e UNION ALL SELECT b AS n FROM e)
        GROUP BY n
    ),
    tri AS (
        SELECT COUNT(*) AS t
        FROM e e1
        JOIN e e2 ON e2.a = e1.b
        JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b
    )
    SELECT (SELECT COUNT(*) FROM deg) AS n_nodes,
           (SELECT COUNT(*) FROM e) AS n_edges,
           (SELECT CAST(t AS BIGINT) FROM tri) AS n_triangles,
           ROUND(3.0 * (SELECT t FROM tri)
                 / (SELECT CAST(SUM(d * (d - 1) / 2) AS DOUBLE) FROM deg),
                 6) AS clustering
    """,
)
def q_graph_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact triangle count + global clustering coefficient
    (3*triangles / wedges) via the degree-ordered forward algorithm;
    the oracle recounts with the naive a<b<c 3-way self-join.

    Plan: edges dedup (one shuffle on the canonical pair), degree
    aggregation (shuffle on node), rank join (broadcast — the degree
    table is |V|-sized), wedge self-join shuffled on the pivot, closure
    join shuffled on the wedge pair. Every triangle counted exactly
    once from its pivot; no distinct-after-blowup anywhere.
    """
    return triangle_stats(_edges(spark, sf_dir))


def triangle_stats(e: DataFrame) -> DataFrame:
    """Degree-ordered triangle statistics over an undirected edge frame
    with columns ``(a, b)`` (any orientation, self-loops and duplicates
    tolerated — canonicalized here). Returns one row:
    ``(n_nodes, n_edges, n_triangles, clustering)``. Reusable over any
    graph the pipeline builds — e.g. the near-dup pair graph."""
    e = (
        e.filter(F.col("a") != F.col("b"))
        .select(
            F.least("a", "b").alias("a"), F.greatest("a", "b").alias("b")
        )
        .distinct()
    )
    # Undirected degree per node, then a total order (degree, id): the
    # orientation key. localCheckpoint pins the edge set — degrees and
    # the two orientation joins must see the identical frame.
    e = e.localCheckpoint(eager=True)
    deg = (
        e.select(F.col("a").alias("n"))
        .unionAll(e.select(F.col("b").alias("n")))
        .groupBy("n")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    # rank = position in the (d, n) total order; dense ids via window
    # over the |V|-sized degree table (small: one node-space-sized sort).
    from pyspark.sql import Window

    rank = deg.withColumn(
        "r", F.row_number().over(Window.orderBy("d", "n"))
    ).select("n", "d", "r")
    ra = rank.select(F.col("n").alias("a"), F.col("r").alias("ra"))
    rb = rank.select(F.col("n").alias("b"), F.col("r").alias("rb"))
    # Orient each edge low-rank -> high-rank (broadcast: rank is |V| rows)
    de = (
        e.join(F.broadcast(ra), "a")
        .join(F.broadcast(rb), "b")
        .select(
            F.least("ra", "rb").alias("u"),
            F.greatest("ra", "rb").alias("v"),
        )
    )
    # Wedges from each pivot's out-neighborhood (out-degree bounded by
    # O(sqrt(E)) after orientation), closed against the edge set.
    x = de.alias("x")
    y = de.alias("y")
    wedges = (
        x.join(y, F.col("x.u") == F.col("y.u"))
        .filter(F.col("x.v") < F.col("y.v"))
        .select(F.col("x.v").alias("u"), F.col("y.v").alias("v"))
    )
    tri = wedges.join(de, ["u", "v"]).agg(
        F.count(F.lit(1)).alias("n_triangles")
    )
    counts = e.agg(F.count(F.lit(1)).alias("n_edges"))
    nodes = deg.agg(
        F.count(F.lit(1)).alias("n_nodes"),
        F.sum(F.col("d") * (F.col("d") - 1) / 2).alias("_wedges"),
    )
    return (
        nodes.crossJoin(F.broadcast(counts))
        .crossJoin(F.broadcast(tri))
        .select(
            "n_nodes",
            "n_edges",
            "n_triangles",
            F.round(
                3.0 * F.col("n_triangles") / F.col("_wedges"), 6
            ).alias("clustering"),
        )
    )


_HUB = 64  # max pivot degree: hub neighbors carry no link signal


@query(
    "q_graph_common_neighbors",
    oracle=f"""
    WITH {_EDGES_SQL},
    {_ADJ_SQL},
    deg AS (SELECT n, COUNT(*) AS d FROM adj GROUP BY n),
    cn AS (
        SELECT a1.m AS u, a2.m AS w, COUNT(*) AS cn
        FROM adj a1
        JOIN adj a2 ON a2.n = a1.n AND a1.m < a2.m
        JOIN deg dx ON dx.n = a1.n
        WHERE dx.d <= {_HUB}
        GROUP BY 1, 2
    ),
    nonedge AS (
        SELECT cn.u, cn.w, cn.cn
        FROM cn LEFT JOIN e ON e.a = cn.u AND e.b = cn.w
        WHERE e.a IS NULL
    )
    SELECT ne.u, ne.w, ne.cn,
           (1000000 * ne.cn) // (du.d + dw.d - ne.cn) AS jaccard_ppm
    FROM nonedge ne
    JOIN deg du ON du.n = ne.u
    JOIN deg dw ON dw.n = ne.w
    ORDER BY jaccard_ppm DESC, ne.cn DESC, ne.u, ne.w
    LIMIT 100
    """,
)
def q_graph_common_neighbors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LINK PREDICTION by hub-capped common neighbors + Jaccard: for
    every non-adjacent pair (u, w) sharing at least one neighbor of
    degree <= 64, count the shared low-degree neighbors and score
    ``jaccard_ppm = 1e6 * cn / (deg(u) + deg(w) - cn)`` in EXACT
    integer arithmetic (floor division — bit-identical cross-engine,
    the suite's fixed-point discipline), returning the top 100 by
    (score, cn, u, w) — a total order, so the limit is deterministic.

    The HUB CAP is the semantics, not a shortcut: a neighbor shared
    through a celebrity node carries no link signal (every pair shares
    it), and it is exactly what makes the plan scale — wedge fan-out is
    bounded by HUB^2 per pivot instead of deg^2, the same reason
    Adamic-Adar downweights high-degree neighbors. The oracle recounts
    the identical definition naively.

    Plan shape: adjacency + degrees (one shuffle each), pivot-capped
    wedge self-join shuffled on the pivot (bounded fan-out), group-by
    on the candidate pair, LEFT ANTI against the edge set to keep
    non-edges only, two BROADCAST degree joins (|V|-sized), and a
    TakeOrderedAndProject top-k — no global sort of the pair space.
    """
    e = _edges(spark, sf_dir).localCheckpoint(eager=True)
    adj = _adjacency(e)
    deg = adj.groupBy("n").agg(F.count(F.lit(1)).alias("d"))
    low = deg.filter(F.col("d") <= _HUB).select("n")
    a1 = adj.join(F.broadcast(low), "n").alias("a1")
    a2 = adj.alias("a2")
    cn = (
        a1.join(
            a2,
            (F.col("a2.n") == F.col("a1.n"))
            & (F.col("a1.m") < F.col("a2.m")),
        )
        .groupBy(
            F.col("a1.m").alias("u"), F.col("a2.m").alias("w")
        )
        .agg(F.count(F.lit(1)).alias("cn"))
    )
    nonedge = cn.join(
        e,
        (F.col("a") == F.col("u")) & (F.col("b") == F.col("w")),
        "left_anti",
    )
    du = deg.select(F.col("n").alias("u"), F.col("d").alias("du"))
    dw = deg.select(F.col("n").alias("w"), F.col("d").alias("dw"))
    return (
        nonedge.join(F.broadcast(du), "u")
        .join(F.broadcast(dw), "w")
        .select(
            "u",
            "w",
            "cn",
            F.expr("(1000000 * cn) div (du + dw - cn)").alias(
                "jaccard_ppm"
            ),
        )
        .orderBy(
            F.desc("jaccard_ppm"), F.desc("cn"), F.asc("u"), F.asc("w")
        )
        .limit(100)
    )


@query(
    "q_graph_bfs_depth",
    oracle=f"""
    WITH RECURSIVE {_EDGES_SQL},
    {_ADJ_SQL},
    walk(n, depth) AS (
        SELECT n, 0 FROM (SELECT DISTINCT n FROM adj) s
        WHERE n % 100 = 0
        UNION
        SELECT adj.m, walk.depth + 1
        FROM walk JOIN adj ON adj.n = walk.n
        WHERE walk.depth < 6
    )
    SELECT depth, COUNT(*) AS n_nodes, CAST(MIN(n) AS BIGINT) AS min_node,
           CAST(SUM(n) AS BIGINT) AS sum_nodes
    FROM (SELECT n, MIN(depth) AS depth FROM walk GROUP BY n)
    GROUP BY depth
    """,
)
def q_graph_bfs_depth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-source BFS depth (shortest hop count from the seed set
    ``node % 100 == 0``, capped at 6 hops) — the iterative-algorithm
    primitive Spark lacks a recursive CTE for, cross-checked against
    DuckDB's ``WITH RECURSIVE`` evaluating the same walk. Output: node
    count, min node id, and id checksum per depth level.

    Rewrite: frontier-expansion BFS — each round joins the CURRENT
    frontier (nodes first reached last round) against the adjacency
    list, anti-joins the visited set, and the driver holds ONE scalar
    (the frontier size) to stop early; visited/frontier are
    checkpointed per round so the plan never re-derives round k-1
    inside round k (the lineage blowup that kills naive iterative
    Spark). 6 rounds = 6 bounded shuffles.

    100 TB shape: this is Pregel's synchronous BFS on DataFrames —
    each round joins the adjacency against the BROADCAST frontier
    (frontier and visited are node-space-bounded, KBs here; on a graph
    whose reachable set outgrows broadcast, both joins degrade
    gracefully to shuffles), and the early exit fires the moment a
    frontier drains — measured at sf0.1: saturation at round 4 of 6,
    ~1.1 s per live round, round cost CONSTANT in input size because
    every round touches only the aggregate-sized adjacency.
    """
    e = _edges(spark, sf_dir)
    # The node space is manifest-bounded (modular ids), so the frontier
    # and visited frames are KB-sized however large the input: coalesce
    # them to ONE partition before each checkpoint — 32-partition
    # shuffles of 3k rows would make task-launch overhead, not data,
    # the round cost (measured: 26.6 s -> ~8 s at sf0.1). On a graph
    # whose frontier outgrows one executor, drop the coalesce; the
    # loop body is partition-count-agnostic.
    adj = _adjacency(e).coalesce(4).localCheckpoint(eager=True)
    frontier = (
        adj.select("n")
        .distinct()
        .filter(F.col("n") % 100 == 0)
        .select("n", F.lit(0).alias("depth"))
        .coalesce(1)
        .localCheckpoint(eager=True)
    )
    visited = frontier
    for depth in range(1, 7):
        nxt = (
            adj.join(F.broadcast(frontier.select("n")), "n")
            .select(F.col("m").alias("n"))
            .distinct()
            .join(
                F.broadcast(visited.select("n")), "n", "left_anti"
            )
            .select("n", F.lit(depth).alias("depth"))
            .coalesce(1)
            .localCheckpoint(eager=True)
        )
        if nxt.count() == 0:  # one scalar per round
            break
        visited = visited.unionAll(nxt).coalesce(1).localCheckpoint(
            eager=True
        )
        frontier = nxt
    return visited.groupBy("depth").agg(
        F.count(F.lit(1)).alias("n_nodes"),
        F.min("n").cast("bigint").alias("min_node"),
        F.sum("n").cast("bigint").alias("sum_nodes"),
    )
