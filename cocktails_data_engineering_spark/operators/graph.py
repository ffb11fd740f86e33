"""Graph / iterative operators (SURVEY.md §2.1 O5, O11-O14).

The reference's core algorithm is a level-synchronous BFS over a link graph
(``scripts/spiders/web_spider_oo.py:91-138``): per depth, take the frontier,
skip visited URLs, expand children, union them into the next frontier.  Here
that becomes the canonical Spark iterative pattern — a driver-side loop of
DataFrame ops with per-round ``localCheckpoint()`` to truncate lineage —
applied to an edge list derived deterministically from the fixture tables so
a DuckDB recursive CTE can oracle-check it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..checkpointing import materialize, materialize_big, materialize_big_lazy
from ..functions.numerics import dsum
from ..registry import register
from ..sources.tables import load

MAX_DEPTH = 3  # reference tests pen_depth ∈ {1,2,4} (spider_tester.py:16-63)


def bfs_min_depth(edges: DataFrame, roots: DataFrame, max_depth: int) -> DataFrame:
    """Level-synchronous BFS: minimum depth per reachable node.

    ``edges``: (src, dst); ``roots``: (node).  Returns (node, depth).

    Mirrors run_spider's loop (web_spider_oo.py:93-135): frontier =
    previous level's children minus visited (left-anti join, the O5
    visited-set dedup), expand via the edge list, union into visited.

    Scale: each round is one shuffle-join frontier⋈edges (frontier is
    usually small → AQE flips it to broadcast); per-round
    :func:`..checkpointing.materialize` truncates the plan so lineage
    doesn't grow with depth — without it, round N replays rounds 0..N-1.
    Set ``spark.graft.checkpointDir`` to durable storage on a real
    cluster and every round checkpoints reliably (localCheckpoint blocks
    die with a lost executor).  Guarded for max_depth=0
    (reference quirk Q5: pen_depth=0 crashes the reference; we return
    just roots).
    """
    frontier = roots.select(F.col("node")).distinct().transform(materialize)
    visited = frontier.select("node", F.lit(0).alias("depth"))

    for depth in range(1, max_depth + 1):
        children = (
            frontier.join(edges, frontier.node == edges.src)
            .select(F.col("dst").alias("node"))
            .distinct()
        )
        frontier = children.join(visited, "node", "left_anti").transform(materialize)
        if not frontier.take(1):
            break
        visited = visited.union(frontier.select("node", F.lit(depth).alias("depth")))

    return visited.transform(materialize)


def derived_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic synthetic link graph on 30 nodes from the orders table:
    edge (o_custkey % 30) -> (o_orderkey % 30)."""
    orders = load(spark, sf_dir, "orders")
    return (
        orders.select(
            (F.col("o_custkey") % 30).alias("src"),
            (F.col("o_orderkey") % 30).alias("dst"),
        )
        .distinct()
    )


@register(
    "bfs_crawl_sim",
    oracle=f"""
WITH RECURSIVE e AS (
  SELECT DISTINCT o_custkey % 30 AS src, o_orderkey % 30 AS dst FROM orders
),
walk(node, depth) AS (
  SELECT CAST(0 AS BIGINT) AS node, 0 AS depth
  UNION ALL
  SELECT e.dst AS node, walk.depth + 1 AS depth
  FROM walk JOIN e ON e.src = walk.node
  WHERE walk.depth < {MAX_DEPTH}
)
SELECT node, CAST(MIN(depth) AS INT) AS depth FROM walk GROUP BY node
""",
)
def bfs_crawl_sim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end BFS crawl simulation (O14): min depth of every node
    reachable within {MAX_DEPTH} hops of node 0 over the derived link
    graph.  DuckDB oracle: recursive CTE + MIN(depth)."""
    edges = derived_edges(spark, sf_dir)
    roots = spark.range(1).select(F.lit(0).cast("long").alias("node"))
    return bfs_min_depth(edges, roots, MAX_DEPTH).select(
        "node", F.col("depth").cast("int").alias("depth")
    )


@register(
    "graph_degree_stats",
    oracle="""
WITH e AS (SELECT DISTINCT o_custkey % 30 AS src, o_orderkey % 30 AS dst FROM orders)
SELECT src AS node, COUNT(*) AS out_degree, COUNT(DISTINCT dst) AS n_children
FROM e GROUP BY src ORDER BY node
""",
)
def graph_degree_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree statistics over the edge table — the crawl-stats aggregation
    the reference's ``indexing`` table exists to answer
    (web_spider_oo.py:302-319)."""
    e = derived_edges(spark, sf_dir)
    return (
        e.groupBy(F.col("src").alias("node"))
        .agg(F.count(F.lit(1)).alias("out_degree"), F.countDistinct("dst").alias("n_children"))
        .orderBy("node")
    )


@register(
    "connected_reachable_pairs",
    oracle="""
WITH e AS (SELECT DISTINCT o_custkey % 30 AS src, o_orderkey % 30 AS dst FROM orders)
SELECT a.src, b.dst
FROM e a JOIN e b ON a.dst = b.src
WHERE a.src <> b.dst
GROUP BY a.src, b.dst
""",
)
def connected_reachable_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-hop reachability (edge-list self-join) — the graph-closure shape
    of the link-index tables."""
    e = derived_edges(spark, sf_dir)
    a = e.alias("a")
    b = e.alias("b")
    return (
        a.join(b, F.col("a.dst") == F.col("b.src"))
        .filter(F.col("a.src") != F.col("b.dst"))
        .select(F.col("a.src").alias("src"), F.col("b.dst").alias("dst"))
        .distinct()
    )


# ---------------------------------------------------------------------------
# PageRank (fixed-iteration, engine-stable arithmetic)
# ---------------------------------------------------------------------------
PR_ITERS = 3
PR_DAMPING = 0.85


def _pagerank_oracle() -> str:
    """Unrolled PR_ITERS PageRank iterations as chained CTEs.

    Arithmetic contract (mirrored exactly by the Spark plan): per-edge
    contributions round to 12 decimals, accumulate in DECIMAL(18,12)
    (order-independent), and each iteration's rank rounds to 9 decimals
    — so both engines carry bit-identical ranks into the next round.
    Dangling-node mass is dropped (documented variant; both sides agree).
    """
    parts = [
        """WITH e AS (SELECT DISTINCT o_custkey % 30 AS src, o_orderkey % 30 AS dst FROM orders),
nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
n AS (SELECT COUNT(*) AS n_nodes FROM nodes),
outd AS (SELECT src, COUNT(*) AS out_deg FROM e GROUP BY src),
r0 AS (SELECT node, ROUND(1.0 / n_nodes, 9) AS rank FROM nodes CROSS JOIN n)"""
    ]
    prev = "r0"
    for i in range(1, PR_ITERS + 1):
        parts.append(
            f"""c{i} AS (
  SELECT e.dst, ROUND(r.rank / o.out_deg, 12) AS contrib
  FROM e JOIN {prev} r ON r.node = e.src JOIN outd o ON o.src = e.src
),
s{i} AS (
  SELECT dst, CAST(SUM(CAST(contrib AS DECIMAL(18,12))) AS DOUBLE) AS in_sum
  FROM c{i} GROUP BY dst
),
r{i} AS (
  SELECT nodes.node,
         ROUND((1 - {PR_DAMPING}) / n_nodes + {PR_DAMPING} * COALESCE(s{i}.in_sum, 0.0), 9) AS rank
  FROM nodes CROSS JOIN n LEFT JOIN s{i} ON s{i}.dst = nodes.node
)"""
        )
        prev = f"r{i}"
    return ",\n".join(parts) + f"\nSELECT node, rank FROM {prev}"


@register("pagerank_crawl_graph", oracle=_pagerank_oracle())
def pagerank_crawl_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank over the derived link graph, PR_ITERS fixed iterations
    (damping 0.85) — the canonical iterative graph algorithm a crawl
    index feeds (ranking crawled pages by link structure).

    Spark shape per iteration: contributions = edges ⋈ ranks ⋈ out-degrees
    (one shuffle on src), DECIMAL-summed per destination (one shuffle on
    dst, partial map-side), then a left join back to the node set for
    dangling destinations.  Ranks round to 9 decimals per round and
    contributions to 12 BEFORE the order-independent DECIMAL sum, so any
    partitioning — 8 local threads or 1000 executors — produces the
    identical result the unrolled-CTE oracle computes.  The driver loop
    checkpoints per round (lineage truncation, same as bfs_min_depth).
    """
    return pagerank_over(spark, derived_edges(spark, sf_dir))


def pagerank_over(spark: SparkSession, edges: DataFrame) -> DataFrame:
    """The PageRank loop over an arbitrary (src, dst) edge DataFrame —
    shared by the registered fixture query and the large-graph scale
    stress (tools/graph_scale_stress.py)."""
    e = edges.transform(materialize)
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
        .transform(materialize)
    )
    n_nodes = nodes.count()
    outd = e.groupBy("src").agg(F.count(F.lit(1)).alias("out_deg"))
    ranks = nodes.select("node", F.round(F.lit(1.0) / n_nodes, 9).alias("rank"))

    for _ in range(PR_ITERS):
        contrib = (
            e.join(ranks, ranks.node == e.src)
            .join(outd, "src")
            .select("dst", F.round(F.col("rank") / F.col("out_deg"), 12).alias("contrib"))
        )
        in_sum = contrib.groupBy("dst").agg(
            F.sum(F.col("contrib").cast("decimal(18,12)")).cast("double").alias("in_sum")
        )
        ranks = (
            nodes.join(in_sum, nodes.node == in_sum.dst, "left")
            .select(
                "node",
                F.round(
                    (1 - PR_DAMPING) / n_nodes
                    + PR_DAMPING * F.coalesce("in_sum", F.lit(0.0)),
                    9,
                ).alias("rank"),
            )
            .transform(materialize)
        )
    return ranks


# ---------------------------------------------------------------------------
# Triangle counting (degree-oriented) over a co-occurrence graph
# ---------------------------------------------------------------------------
@register(
    "cooccurrence_triangle_stats",
    oracle="""
WITH edges AS (
  SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
  FROM lineitem a JOIN lineitem b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
),
verts AS (
  SELECT node, COUNT(*) AS deg FROM (
    SELECT u AS node FROM edges UNION ALL SELECT v AS node FROM edges
  ) GROUP BY node
),
tris AS (
  SELECT COUNT(*) AS t
  FROM edges e1 JOIN edges e2 ON e2.u = e1.v
       JOIN edges e3 ON e3.u = e1.u AND e3.v = e2.v
)
SELECT CAST((SELECT COUNT(*) FROM verts) AS BIGINT) AS n_vertices,
       CAST((SELECT COUNT(*) FROM edges) AS BIGINT) AS n_edges,
       CAST((SELECT t FROM tris) AS BIGINT) AS n_triangles,
       CAST((SELECT SUM(deg * (deg - 1) / 2) FROM verts) AS BIGINT) AS n_wedges,
       3.0 * (SELECT t FROM tris) / (SELECT SUM(deg * (deg - 1) / 2) FROM verts)
         AS global_clustering
""",
)
def cooccurrence_triangle_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle count + global clustering coefficient of the
    part-co-occurrence graph (parts appearing in the same order share an
    edge) — the canonical distributed-graph-analytics kernel.

    The naive triangle join costs Σ_v deg(v)² wedges, ruinous under
    power-law degrees.  The standard fix is DEGREE ORIENTATION: direct
    every edge from its (deg, id)-smaller endpoint to the larger; each
    triangle survives exactly once and per-vertex out-degree is capped at
    O(√m) — this turns the 100 TB wedge explosion into Σ d_out² ≤ m^1.5.
    Plan: edges come from per-order sorted part arrays (one groupBy, then
    map-side in-array pair expansion — no fact-table self-join), and the
    Σ d_out² intersection work runs INSIDE `array_intersect` over
    out-neighbor adjacency arrays rather than as a materialized wedge
    shuffle.  The oracle counts via the simpler id-orientation, which
    yields the same once-per-triangle total.
    """
    li = load(spark, sf_dir, "lineitem")
    # Edge build: one groupBy (map-side-combined collect_set) to per-order
    # sorted part arrays, then in-array pair expansion — a pure projection.
    # This replaces a lineitem self-join, whose probe side shuffles the whole
    # fact table a second time and whose output is the same Σ k² rows this
    # transform emits without any join.  Per-order line counts are bounded
    # (≤7 in TPC-H; one order in any sane schema), so the array stays tiny.
    parts = li.groupBy("l_orderkey").agg(
        F.sort_array(F.collect_set("l_partkey")).alias("ps")
    )
    in_array_pairs = F.explode(
        F.expr(
            "flatten(transform(ps, (x, i) ->"
            " transform(slice(ps, i + 2, size(ps)), y -> struct(x AS u, y AS v))))"
        )
    )
    edges = (
        parts.select(in_array_pairs.alias("p"))
        .select("p.u", "p.v")
        .distinct()
        # edges feed degrees, wedges, and the probe; the list is
        # input-linear (~120M rows at the 100× tier), so it spills to
        # local disk instead of competing with shuffle memory for heap.
        # LAZY (optimization r14, guide §1.2): the blocks are stored by
        # the first stage of the one summary job instead of a dedicated
        # eager checkpoint job — reuse and DISK_ONLY protection identical
        # (VERDICT r13 #3: "two DISK_ONLY checkpoints become one pass").
        .transform(materialize_big_lazy)
    )
    deg = (
        edges.select(F.col("u").alias("node"))
        .unionAll(edges.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    du = deg.select(F.col("node").alias("u"), F.col("deg").alias("deg_u"))
    dv = deg.select(F.col("node").alias("v"), F.col("deg").alias("deg_v"))
    # deg is |V|-sized metadata; the joins are written shuffle-style and AQE
    # elects broadcast at runtime when it fits (it does at any test SF).
    with_deg = edges.join(du, "u").join(dv, "v")
    lower_first = (F.col("deg_u") < F.col("deg_v")) | (
        (F.col("deg_u") == F.col("deg_v")) & (F.col("u") < F.col("v"))
    )
    oriented = with_deg.select(
        F.when(lower_first, F.col("u")).otherwise(F.col("v")).alias("src"),
        F.when(lower_first, F.col("v")).otherwise(F.col("u")).alias("dst"),
    ).transform(materialize_big_lazy)  # same input-linear scale as `edges`
    # Triangle counting by adjacency intersection, not wedge materialization:
    # a wedge self-join emits Σ d_out² rows into a shuffle before the closing
    # probe; intersecting out-neighbor arrays per edge computes the same
    # closed-wedge count with the graph shuffled once into |V| adjacency rows
    # and never materializing a wedge.  Orientation bounds every array at
    # O(√m), so per-row intersection work — and the worst row's memory — is
    # capped regardless of raw degree skew.  Each triangle u→{v,w}, v→w is
    # counted exactly once, at edge (u,v) with w in adj(u) ∩ adj(v).
    adj = oriented.groupBy("src").agg(
        F.sort_array(F.collect_list("dst")).alias("adj")
    )
    a1 = adj.select(F.col("src").alias("e_src"), F.col("adj").alias("adj_src"))
    a2 = adj.select(F.col("src").alias("e_dst"), F.col("adj").alias("adj_dst"))
    triangles = (
        oriented.select(F.col("src").alias("e_src"), F.col("dst").alias("e_dst"))
        .join(a1, "e_src")
        .join(a2, "e_dst")
        .agg(
            # coalesce: SUM over zero rows is NULL — an empty edge set
            # must report 0 triangles, as the pre-adjacency count did
            F.coalesce(
                F.sum(F.size(F.array_intersect("adj_src", "adj_dst"))), F.lit(0)
            ).alias("t")
        )
    )
    summary = edges.agg(F.count(F.lit(1)).alias("n_edges")).crossJoin(
        deg.agg(
            F.count(F.lit(1)).alias("n_vertices"),
            F.sum(F.col("deg") * (F.col("deg") - 1) / 2).cast("bigint").alias("n_wedges"),
        )
    ).crossJoin(triangles)
    return summary.select(
        F.col("n_vertices").cast("bigint"),
        F.col("n_edges").cast("bigint"),
        F.col("t").cast("bigint").alias("n_triangles"),
        "n_wedges",
        (F.lit(3.0) * F.col("t") / F.col("n_wedges")).alias("global_clustering"),
    )


# ---------------------------------------------------------------------------
# K-core decomposition (bounded peeling rounds)
# ---------------------------------------------------------------------------
KCORE_K = 3
KCORE_ROUNDS = 3

_KCORE_UND = """
SELECT DISTINCT a, b FROM (
  SELECT o_custkey % 30 AS a, o_orderkey % 30 AS b FROM orders
  UNION ALL
  SELECT o_orderkey % 30 AS a, o_custkey % 30 AS b FROM orders
) WHERE a <> b
"""


def _kcore_oracle() -> str:
    ctes = [f"e0 AS ({_KCORE_UND})"]
    for r in range(KCORE_ROUNDS):
        ctes.append(
            f"""n{r + 1} AS (
  SELECT a AS node FROM e{r} GROUP BY a HAVING COUNT(*) >= {KCORE_K}
)"""
        )
        ctes.append(
            f"""e{r + 1} AS (
  SELECT e.a, e.b FROM e{r} e
  JOIN n{r + 1} x ON x.node = e.a
  JOIN n{r + 1} y ON y.node = e.b
)"""
        )
    return (
        "WITH " + ",\n".join(ctes) + f"""
SELECT a AS node, COUNT(*) AS degree
FROM e{KCORE_ROUNDS} GROUP BY a
"""
    )


@register("kcore_crawl_graph", oracle=_kcore_oracle())
def kcore_crawl_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """{KCORE_K}-core peeling over the undirected crawl graph:
    {KCORE_ROUNDS} rounds of "drop every node with degree < {KCORE_K},
    recompute degrees" — the dense-subgraph extractor that separates a
    link graph's spam farms and hub cores from its long tail (a crawler
    prioritization signal next to PageRank).

    Fixed unrolled rounds keep both engines on the identical computation
    (the oracle chains one CTE pair per round), the same bounded-
    iteration discipline as pagerank_crawl_graph.

    Plan at 100 TB: each round is one degree aggregate (map-side
    combined) + two semi-join-shaped filters of the edge list against
    the surviving-node set — everything keyed on node ids, monotonically
    shrinking, never quadratic."""
    orders = load(spark, sf_dir, "orders")
    fwd = orders.select(
        (F.col("o_custkey") % 30).alias("a"), (F.col("o_orderkey") % 30).alias("b")
    )
    bwd = orders.select(
        (F.col("o_orderkey") % 30).alias("a"), (F.col("o_custkey") % 30).alias("b")
    )
    edges = fwd.unionAll(bwd).filter(F.col("a") != F.col("b")).distinct()
    return kcore_over(spark, edges)


def kcore_over(spark: SparkSession, edges: DataFrame) -> DataFrame:
    """The peeling loop over an arbitrary undirected (a, b) edge
    DataFrame (both directions present, a ≠ b, distinct) — shared by the
    registered fixture query and the large-graph scale stress."""
    for _ in range(KCORE_ROUNDS):
        alive = (
            edges.groupBy("a")
            .agg(F.count(F.lit(1)).alias("deg"))
            .filter(F.col("deg") >= KCORE_K)
            .select(F.col("a").alias("node"))
        ).transform(materialize)
        # No broadcast hint: AQE broadcasts the alive set while it is
        # small (every fixture) and falls back to a shuffled semi-join
        # when the surviving-node set is itself large — forcing broadcast
        # was measured 2.7x at 10x edges on the 500k-node PA stress graph
        # (driver collect + rebroadcast per round); unhinted it's ≤2x.
        # Materializing alive keeps the degree aggregate from running
        # twice (once per semi-join side).
        edges = (
            edges.join(alive.select(F.col("node").alias("a")), "a", "left_semi")
            .join(alive.select(F.col("node").alias("b")), "b", "left_semi")
            .transform(materialize)
        )
    return edges.groupBy(F.col("a").alias("node")).agg(
        F.count(F.lit(1)).alias("degree")
    )


# ---------------------------------------------------------------------------
# Degree assortativity (Pearson r of endpoint degrees)
# ---------------------------------------------------------------------------
@register(
    "degree_assortativity",
    oracle=f"""
WITH e AS (
SELECT DISTINCT a, b FROM (
  SELECT o_custkey % 97 AS a, o_orderkey % 401 AS b FROM orders
  UNION ALL
  SELECT o_orderkey % 401 AS a, o_custkey % 97 AS b FROM orders
) WHERE a <> b
),
deg AS (SELECT a AS node, COUNT(*) AS d FROM e GROUP BY a),
de AS (
  SELECT da.d AS x, db.d AS y
  FROM e JOIN deg da ON da.node = e.a JOIN deg db ON db.node = e.b
),
s AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS m,
         CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
         CAST(SUM(x * y) AS BIGINT) AS sxy,
         CAST(SUM(x * x) AS BIGINT) AS sxx,
         CAST(SUM(y * y) AS BIGINT) AS syy
  FROM de
)
SELECT m,
       ROUND((CAST(sxy AS DOUBLE) / m - (CAST(sx AS DOUBLE) / m) * (CAST(sy AS DOUBLE) / m))
             / (sqrt(CAST(sxx AS DOUBLE) / m - (CAST(sx AS DOUBLE) / m) * (CAST(sx AS DOUBLE) / m))
                * sqrt(CAST(syy AS DOUBLE) / m - (CAST(sy AS DOUBLE) / m) * (CAST(sy AS DOUBLE) / m))),
             6) AS assortativity
FROM s
""",
)
def degree_assortativity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree assortativity of the undirected crawl graph: the Pearson
    correlation of endpoint degrees over the directed edge list —
    positive means hubs link to hubs (social-network shape), negative
    means hubs link to leaves (web/spam-farm shape; this bipartite-ish
    fixture graph is strongly disassortative); the one-number
    structural fingerprint used beside PageRank and k-core when
    deciding crawl policy.

    All accumulations are INTEGER (degrees and their products), so only
    the final closed-form expression runs in double — identical IEEE
    evaluation order on both engines, one ROUND(6).

    Plan at 100 TB: one degree aggregate, two node-keyed joins to
    decorate edge endpoints, one scalar reduce — linear in edges, and
    the degree table broadcasts when the vertex set allows."""
    orders = load(spark, sf_dir, "orders")
    fwd = orders.select(
        (F.col("o_custkey") % 97).alias("a"), (F.col("o_orderkey") % 401).alias("b")
    )
    bwd = orders.select(
        (F.col("o_orderkey") % 401).alias("a"), (F.col("o_custkey") % 97).alias("b")
    )
    edges = fwd.unionAll(bwd).filter(F.col("a") != F.col("b")).distinct()
    edges = materialize(edges)
    deg = edges.groupBy("a").agg(F.count(F.lit(1)).alias("d"))
    de = (
        edges.join(
            F.broadcast(deg.select(F.col("a"), F.col("d").alias("x"))), "a"
        ).join(
            F.broadcast(
                deg.select(F.col("a").alias("b"), F.col("d").alias("y"))
            ),
            "b",
        )
    ).select("x", "y")
    s = de.agg(
        F.count(F.lit(1)).alias("m"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    md = F.col("m").cast("double")
    mx, my = F.col("sx") / md, F.col("sy") / md
    cov = F.col("sxy") / md - mx * my
    sdx = F.sqrt(F.col("sxx") / md - mx * mx)
    sdy = F.sqrt(F.col("syy") / md - my * my)
    return s.select("m", F.round(cov / (sdx * sdy), 6).alias("assortativity"))


# ---------------------------------------------------------------------------
# Label propagation communities (synchronous LPA, unrolled rounds)
# ---------------------------------------------------------------------------
LPA_ROUNDS = 3


def _lpa_oracle() -> str:
    parts = [
        """WITH base AS (
  SELECT o_orderkey % 500 AS a,
         50 * ((o_orderkey % 500) // 50) + (o_custkey % 50) AS b
  FROM orders
),
e AS (
  SELECT DISTINCT a, b FROM (
    SELECT a, b FROM base UNION ALL SELECT b AS a, a AS b FROM base
  ) WHERE a <> b
),
nodes AS (SELECT DISTINCT a AS node FROM e),
l0 AS (SELECT node, node AS label FROM nodes)"""
    ]
    prev = "l0"
    for i in range(1, LPA_ROUNDS + 1):
        parts.append(
            f"""c{i} AS (
  SELECT e.a AS node, p.label, COUNT(*) AS n
  FROM e JOIN {prev} p ON p.node = e.b
  GROUP BY e.a, p.label
),
l{i} AS (
  SELECT node, label
  FROM (SELECT node, label,
               ROW_NUMBER() OVER (PARTITION BY node ORDER BY n DESC, label) AS rk
        FROM c{i}) t
  WHERE rk = 1
)"""
        )
        prev = f"l{i}"
    return (
        ",\n".join(parts)
        + f"""
SELECT label AS community,
       CAST(COUNT(*) AS BIGINT) AS n_members,
       CAST(MIN(node) AS BIGINT) AS min_node,
       CAST(MAX(node) AS BIGINT) AS max_node
FROM {prev} GROUP BY label"""
    )


@register("label_propagation_communities", oracle=_lpa_oracle())
def label_propagation_communities(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Community detection by synchronous label propagation (Raghavan et
    al., 2007), {LPA_ROUNDS} unrolled rounds on the undirected 97/401
    crawl graph: every node starts as its own label; each round adopts
    the most frequent label among neighbors, ties broken by the SMALLEST
    label — fully deterministic (the classic LPA pathology, random
    tie-breaks, is exactly what an engine with a value-exact oracle
    cannot ship).  Output: per-community size and node range.

    Everything is INTEGER arithmetic (labels, counts) — no rounding
    discipline needed; both engines agree exactly at any iteration
    count.

    Plan at 100 TB: per round, one shuffle of edges-by-endpoint to pick
    up labels, one (node, label) count with map-side combine, one
    windowed top-1 per node (partial TakeOrdered inside the node
    partition).  Labels table stays node-sized; the edge table is never
    materialized per-round.  Synchronous rounds = the bulk-synchronous
    Pregel schedule."""
    orders = load(spark, sf_dir, "orders")
    # block-structured fixture: 10 disconnected 50-node blocks (edges stay
    # inside a's block) so LPA has real communities to find — the dense
    # 97/401 assortativity graph collapses to one label immediately.
    a = (F.col("o_orderkey") % 500).alias("a")
    b = (
        50 * F.floor((F.col("o_orderkey") % 500) / 50).cast("bigint")
        + (F.col("o_custkey") % 50)
    ).alias("b")
    base = orders.select(a, b)
    edges = materialize(
        base.unionAll(base.select(F.col("b").alias("a"), F.col("a").alias("b")))
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )
    return lpa_over(spark, edges)


def lpa_over(spark: SparkSession, edges: DataFrame) -> DataFrame:
    """The synchronous-LPA loop over an arbitrary undirected (a, b) edge
    DataFrame — shared by the registered fixture query and the
    large-graph scale stress."""
    labels = edges.select(F.col("a").alias("node")).distinct().select(
        "node", F.col("node").alias("label")
    )
    w = Window.partitionBy("node").orderBy(F.col("n").desc(), "label")
    for _ in range(LPA_ROUNDS):
        labels = (
            edges.join(labels.withColumnRenamed("node", "b_node"),
                       F.col("b") == F.col("b_node"))
            .groupBy(F.col("a").alias("node"), "label")
            .agg(F.count(F.lit(1)).alias("n"))
            .withColumn("rk", F.row_number().over(w))
            .filter(F.col("rk") == 1)
            .select("node", "label")
        )
    return labels.groupBy(F.col("label").alias("community")).agg(
        F.count(F.lit(1)).alias("n_members"),
        F.min("node").alias("min_node"),
        F.max("node").alias("max_node"),
    )


# ---------------------------------------------------------------------------
# Adamic-Adar link prediction (common-neighbor scoring)
# ---------------------------------------------------------------------------
AA_TOP_K = 20


@register(
    "adamic_adar_link_prediction",
    oracle=f"""
WITH base AS (
  SELECT o_orderkey % 500 AS a,
         50 * ((o_orderkey % 500) // 50) + (o_custkey % 50) AS b
  FROM orders
),
e AS (
  SELECT DISTINCT a, b FROM (
    SELECT a, b FROM base UNION ALL SELECT b AS a, a AS b FROM base
  ) WHERE a <> b
),
deg AS (SELECT a AS node, COUNT(*) AS deg FROM e GROUP BY a),
cn AS (
  SELECT e1.a AS u, e2.a AS v, e1.b AS z
  FROM e e1 JOIN e e2 ON e2.b = e1.b AND e1.a < e2.a
),
scored AS (
  SELECT cn.u, cn.v, CAST(COUNT(*) AS BIGINT) AS n_common,
         ROUND(CAST(SUM(CAST(ROUND(1.0 / ROUND(LN(d.deg), 6), 6)
                             AS DECIMAL(18,6))) AS DOUBLE), 6) AS aa_score
  FROM cn JOIN deg d ON d.node = cn.z
  GROUP BY cn.u, cn.v
),
nonadj AS (
  SELECT s.* FROM scored s
  WHERE NOT EXISTS (SELECT 1 FROM e WHERE e.a = s.u AND e.b = s.v)
)
SELECT u, v, n_common, aa_score,
       CAST(ROW_NUMBER() OVER (ORDER BY aa_score DESC, u, v) AS INT) AS rank
FROM nonadj
ORDER BY aa_score DESC, u, v
LIMIT {AA_TOP_K}
""",
)
def adamic_adar_link_prediction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Adamic-Adar link prediction on the blocked community graph: score
    every NON-adjacent node pair by sum(1 / ln(deg(z))) over common
    neighbors z (rare shared neighbors count more), emit the top
    {AA_TOP_K} predicted links — the classic friend-of-friend
    recommender and the link-level complement of the LPA communities.
    deg(z) >= 2 for any common neighbor of a distinct pair, so ln never
    vanishes; ln rounds to 6 before the reciprocal (cross-engine libm
    discipline) and per-neighbor weights accumulate in DECIMAL.

    Plan at 100 TB: common-neighbor pairs come from one equi-self-join
    on the shared endpoint — cost sum_z deg(z)^2, bounded by the block
    structure (never the full graph square); degrees broadcast; the
    known-edge removal is a broadcast anti-join; top-k is a partial
    TakeOrdered, no global sort materialized."""
    orders = load(spark, sf_dir, "orders")
    a = (F.col("o_orderkey") % 500).alias("a")
    b = (
        50 * F.floor((F.col("o_orderkey") % 500) / 50).cast("bigint")
        + (F.col("o_custkey") % 50)
    ).alias("b")
    base = orders.select(a, b)
    edges = materialize(
        base.unionAll(base.select(F.col("b").alias("a"), F.col("a").alias("b")))
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )
    deg = edges.groupBy(F.col("a").alias("node")).agg(F.count(F.lit(1)).alias("deg"))
    e1 = edges.select(F.col("a").alias("u"), F.col("b").alias("z"))
    e2 = edges.select(F.col("a").alias("v"), F.col("b").alias("z2"))
    cn = e1.join(e2, (F.col("z2") == F.col("z")) & (F.col("u") < F.col("v"))).select(
        "u", "v", "z"
    )
    weight = F.round(1.0 / F.round(F.log(F.col("deg")), 6), 6)
    scored = (
        cn.join(F.broadcast(deg), F.col("node") == F.col("z"))
        .groupBy("u", "v")
        .agg(
            F.count(F.lit(1)).alias("n_common"),
            F.round(dsum(weight), 6).alias("aa_score"),
        )
    )
    nonadj = scored.join(
        F.broadcast(edges),
        (F.col("a") == F.col("u")) & (F.col("b") == F.col("v")),
        "left_anti",
    )
    w = Window.orderBy(F.col("aa_score").desc(), "u", "v")
    return (
        nonadj.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= AA_TOP_K)
        .select("u", "v", "n_common", "aa_score", "rank")
    )


# ---------------------------------------------------------------------------
# HITS hubs & authorities (Kleinberg), fixed unrolled iterations
# ---------------------------------------------------------------------------
HITS_ITERS = 3
_H_DEC = "decimal(18,9)"


def _hits_oracle() -> str:
    """Unrolled HITS_ITERS hub/authority rounds as chained CTEs.

    Arithmetic contract (mirrored exactly by the Spark plan): scores are
    9-dp doubles; each update sums them in DECIMAL(18,9) (exact,
    order-independent), L1-normalizes by the exact DECIMAL total, and
    rounds back to 9 — both engines carry bit-identical scores into the
    next round.  L1 (not L2) normalization is the deliberate variant: it
    needs no sqrt, keeping the chain free of a second transcendental."""
    parts = [
        """WITH e AS (SELECT DISTINCT o_custkey % 30 AS src, o_orderkey % 30 AS dst FROM orders),
nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
n AS (SELECT COUNT(*) AS n_nodes FROM nodes),
h0 AS (SELECT node, ROUND(1.0 / n_nodes, 9) AS h FROM nodes CROSS JOIN n)"""
    ]
    for i in range(1, HITS_ITERS + 1):
        parts.append(
            f"""ar{i} AS (
  SELECT e.dst AS node, SUM(CAST(h.h AS DECIMAL(18,9))) AS v
  FROM e JOIN h{i - 1} h ON h.node = e.src GROUP BY e.dst
),
asum{i} AS (SELECT SUM(v) AS s FROM ar{i}),
a{i} AS (
  SELECT nodes.node,
         ROUND(CAST(COALESCE(ar.v, 0) AS DOUBLE) / CAST(s AS DOUBLE), 9) AS a
  FROM nodes CROSS JOIN asum{i} LEFT JOIN ar{i} ar ON ar.node = nodes.node
),
hr{i} AS (
  SELECT e.src AS node, SUM(CAST(a.a AS DECIMAL(18,9))) AS v
  FROM e JOIN a{i} a ON a.node = e.dst GROUP BY e.src
),
hsum{i} AS (SELECT SUM(v) AS s FROM hr{i}),
h{i} AS (
  SELECT nodes.node,
         ROUND(CAST(COALESCE(hr.v, 0) AS DOUBLE) / CAST(s AS DOUBLE), 9) AS h
  FROM nodes CROSS JOIN hsum{i} LEFT JOIN hr{i} hr ON hr.node = nodes.node
)"""
        )
    last = HITS_ITERS
    return (
        ",\n".join(parts)
        + f"""
SELECT h{last}.node, h{last}.h AS hub, a{last}.a AS authority
FROM h{last} JOIN a{last} ON a{last}.node = h{last}.node"""
    )


@register("hits_hub_authority", oracle=_hits_oracle())
def hits_hub_authority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HITS hubs & authorities over the derived link graph, HITS_ITERS
    fixed mutually-recursive rounds with L1 normalization — the second
    classical link-analysis ranking next to pagerank_crawl_graph
    (authorities = heavily-pointed-to pages, hubs = pages pointing at
    good authorities; the crawl-prioritization pair).

    Spark shape per round: authority update = edges ⋈ hub scores (one
    shuffle on src) DECIMAL-summed per dst (partial map-side), L1
    normalizer = ONE exact-decimal scalar broadcast back; hub update
    mirrors it on the transposed edge.  Scores round to 9 per round
    (the pagerank discipline), so any partitioning yields the identical
    result the unrolled-CTE oracle computes.  The driver loop
    checkpoints per round (lineage truncation)."""
    return hits_over(spark, derived_edges(spark, sf_dir))


def hits_over(spark: SparkSession, edges: DataFrame) -> DataFrame:
    """The HITS loop over an arbitrary (src, dst) edge DataFrame —
    shared by the registered fixture query and the large-graph scale
    stress."""
    e = edges.transform(materialize)
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
        .transform(materialize)
    )
    n_nodes = nodes.count()
    h = nodes.select("node", F.round(F.lit(1.0) / n_nodes, 9).alias("h"))

    def _step(scores: DataFrame, col: str, join_on: str, out_key: str, out: str):
        raw = (
            e.join(scores, scores.node == e[join_on])
            .groupBy(e[out_key].alias("node"))
            .agg(F.sum(F.col(col).cast(_H_DEC)).alias("v"))
        )
        v = F.coalesce(F.col("v"), F.lit(0).cast(_H_DEC))
        # Checkpoint the raw update, then normalize via a 1-row aggregate
        # broadcast back.  r8 used an unpartitioned window here to avoid
        # evaluating the `raw` subtree twice — correct on the 30-node
        # fixture, but a single-partition window is exactly the wrong
        # shape for a 500k-node graph (measured: WindowExec collapses the
        # score table to one task).  The half-step checkpoint makes the
        # double-reference free AND truncates lineage, so the old outer
        # per-round materialize is retired with it.
        joined = materialize(nodes.join(raw, "node", "left").select("node", v.alias("v")))
        tot = joined.agg(F.sum("v").alias("s"))
        return joined.crossJoin(F.broadcast(tot)).select(
            "node",
            F.round(F.col("v").cast("double") / F.col("s").cast("double"), 9).alias(out),
        )

    a = None
    for _ in range(HITS_ITERS):
        a = _step(h, "h", "src", "dst", "a")
        h = _step(a, "a", "dst", "src", "h")
    return h.join(a, "node").select(
        "node", F.col("h").alias("hub"), F.col("a").alias("authority")
    )


# ---------------------------------------------------------------------------
# Personalized PageRank: teleport to a seed set, not the uniform vector
# ---------------------------------------------------------------------------
PPR_SEED_MOD = 5  # node % this == 0 -> seed


def _ppr_oracle() -> str:
    """Unrolled PR_ITERS personalized-PageRank iterations — same
    rounding/DECIMAL contract as :func:`_pagerank_oracle`, with the
    teleport mass restarting to the SEED set instead of all nodes."""
    parts = [
        f"""WITH e AS (SELECT DISTINCT o_custkey % 30 AS src, o_orderkey % 30 AS dst FROM orders),
nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
seeds AS (SELECT node FROM nodes WHERE node % {PPR_SEED_MOD} = 0),
ns AS (SELECT COUNT(*) AS n_seeds FROM seeds),
outd AS (SELECT src, COUNT(*) AS out_deg FROM e GROUP BY src),
r0 AS (
  SELECT nodes.node,
         CASE WHEN nodes.node % {PPR_SEED_MOD} = 0
              THEN ROUND(1.0 / n_seeds, 9) ELSE 0.0 END AS rank
  FROM nodes CROSS JOIN ns)"""
    ]
    prev = "r0"
    for i in range(1, PR_ITERS + 1):
        parts.append(
            f"""c{i} AS (
  SELECT e.dst, ROUND(r.rank / o.out_deg, 12) AS contrib
  FROM e JOIN {prev} r ON r.node = e.src JOIN outd o ON o.src = e.src
),
s{i} AS (
  SELECT dst, CAST(SUM(CAST(contrib AS DECIMAL(18,12))) AS DOUBLE) AS in_sum
  FROM c{i} GROUP BY dst
),
r{i} AS (
  SELECT nodes.node,
         ROUND(CASE WHEN nodes.node % {PPR_SEED_MOD} = 0
                    THEN (1 - {PR_DAMPING}) / n_seeds ELSE 0.0 END
               + {PR_DAMPING} * COALESCE(s{i}.in_sum, 0.0), 9) AS rank
  FROM nodes CROSS JOIN ns LEFT JOIN s{i} ON s{i}.dst = nodes.node
)"""
        )
        prev = f"r{i}"
    return (
        ",\n".join(parts)
        + f"""
SELECT node, rank,
       CAST(CASE WHEN node % {PPR_SEED_MOD} = 0 THEN 1 ELSE 0 END AS INT)
         AS is_seed
FROM {prev} ORDER BY node"""
    )


@register("personalized_pagerank_seeds", oracle=_ppr_oracle())
def personalized_pagerank_seeds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Personalized PageRank: the teleport vector restarts to a SEED set
    (node % {PPR_SEED_MOD} == 0) instead of the uniform vector, so the
    stationary mass measures proximity TO THE SEEDS — the graph
    primitive behind "pages related to these trusted roots", seed-based
    crawl prioritization, and topic-sensitive ranking, where global
    PageRank answers a different question entirely.

    Same bounded-iteration discipline as ``pagerank_crawl_graph``:
    {PR_ITERS} unrolled rounds, per-edge contributions rounded to 12
    into an order-independent DECIMAL sum, ranks rounded to 9 per round,
    non-seed teleport mass exactly 0 — both engines carry bit-identical
    vectors into every round.

    Plan at 100 TB: identical shuffle structure to global PageRank (src
    join, dst aggregate, node-set left join) — personalization changes
    only the teleport term, a broadcast-sized seed membership test."""
    e = derived_edges(spark, sf_dir).transform(materialize)
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
        .transform(materialize)
    )
    is_seed = (F.col("node") % PPR_SEED_MOD) == 0
    n_seeds = nodes.filter(is_seed).count()  # O(1) driver scalar
    outd = e.groupBy("src").agg(F.count(F.lit(1)).alias("out_deg"))
    ranks = nodes.select(
        "node",
        F.when(is_seed, F.round(F.lit(1.0) / n_seeds, 9))
        .otherwise(0.0)
        .alias("rank"),
    )
    for _ in range(PR_ITERS):
        contrib = (
            e.join(ranks, ranks.node == e.src)
            .join(outd, "src")
            .select(
                "dst",
                F.round(F.col("rank") / F.col("out_deg"), 12).alias("contrib"),
            )
        )
        in_sum = contrib.groupBy("dst").agg(
            F.sum(F.col("contrib").cast("decimal(18,12)"))
            .cast("double")
            .alias("in_sum")
        )
        ranks = (
            nodes.join(in_sum, nodes.node == in_sum.dst, "left")
            .select(
                "node",
                F.round(
                    F.when(is_seed, (1 - PR_DAMPING) / n_seeds).otherwise(0.0)
                    + PR_DAMPING * F.coalesce("in_sum", F.lit(0.0)),
                    9,
                ).alias("rank"),
            )
            .transform(materialize)
        )
    return ranks.select(
        "node", "rank", is_seed.cast("int").alias("is_seed")
    ).orderBy("node")
