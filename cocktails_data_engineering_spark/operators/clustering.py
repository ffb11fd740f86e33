"""K-means clustering over the embeddings table — the iterative-ML
operator class (Lloyd's algorithm) expressed as DataFrame transformations.

The reference has no ML surface; this supplies the embedding-clustering
step an LLM-data pipeline runs for corpus analysis / IVF index building
(the coarse quantizer of an IVF ANN index IS a k-means codebook — this
composes with operators/similarity.py's ANN path).

Determinism rules (the whole point of the implementation):

- **Init is content-independent**: the k seed centroids are the vectors
  whose ``md5(vec_id)`` sort first — reproducible on any engine, any
  partitioning (same trick as extensions.train_test_split_stats).
- **Distances fold sequentially** over the array (``zip_with`` +
  ``aggregate``) and are rounded to 6 decimals before the argmin, with
  the centroid id as tiebreak — last-ulp sum differences cannot flip an
  assignment.
- **Centroid updates accumulate in DECIMAL(18,12)** per dimension and
  round to 6 decimals, so the next round's inputs are bit-identical
  across engines and partitionings.

Scale notes: centroids (k × dim doubles) always broadcast; the
assignment is a map-side cross join (no shuffle of the vectors); the
update shuffles (k × dim) partial sums per task — independent of row
count.  Rounds are driver-loop iterations with per-round
``localCheckpoint`` (same pattern as graph.bfs_min_depth /
dedup.connected_components).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..checkpointing import materialize
from ..registry import register
from ..sources.tables import load_spread

K = 4
DIM = 64
N_ROUNDS = 5
# vec_id % BATCH_MOD == 0 → today's batch; rest = corpus.  Lives in this
# LEAF module (not curation) so ml.py can use it without creating the
# ml ⇄ curation import cycle that made `import operators.ml` order-dependent.
BATCH_MOD = 10
_DEC = "decimal(18,12)"


def _vectors(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_spread(spark, sf_dir, "embeddings")
    return emb.select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("emb")
    )


def _init_centroids(vecs: DataFrame) -> DataFrame:
    """The K vectors whose md5(vec_id) sort first, as (cid, cemb)."""
    seeds = (
        vecs.select("vec_id", F.md5(F.col("vec_id").cast("string")).alias("h"))
        .orderBy("h", "vec_id")
        .limit(K)
        .select("vec_id")
    )
    return vecs.join(F.broadcast(seeds), "vec_id").select(
        F.col("vec_id").alias("cid"), F.col("emb").alias("cemb")
    )


TARGET_CELL = 500  # expected IVF cell / SemDeDup cluster size at any scale


def dyn_k(n: int) -> int:
    """K = max(K, ceil(n / TARGET_CELL)): cluster/cell count GROWS with
    the corpus so per-cell cost stays constant (see SCALE.md; the same
    rule as curation._sem_k)."""
    import math

    return max(K, math.ceil(n / TARGET_CELL))


def _init_centroids_dyn(vecs: DataFrame, k_dyn: int) -> DataFrame:
    """_init_centroids with a data-scaled K."""
    seeds = (
        vecs.select("vec_id", F.md5(F.col("vec_id").cast("string")).alias("h"))
        .orderBy("h", "vec_id")
        .limit(k_dyn)
        .select("vec_id")
    )
    return vecs.join(F.broadcast(seeds), "vec_id").select(
        F.col("vec_id").alias("cid"), F.col("emb").alias("cemb")
    )


def _oracle_init_dyn(src: str = "vecs") -> str:
    """K-independent oracle seed CTE: window rank vs GREATEST(K, ceil(n/cell))."""
    return f"""init AS (
  SELECT vec_id AS cid, emb AS cemb
  FROM (SELECT vec_id, emb,
               ROW_NUMBER() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) AS rk,
               COUNT(*) OVER () AS n
        FROM {src})
  WHERE rk <= GREATEST({K}, CEIL(n / {TARGET_CELL}.0))
)"""


def _assign(vecs: DataFrame, centroids: DataFrame) -> DataFrame:
    """Nearest centroid per vector: (vec_id, emb, cid, d2).

    Optimization r13 (guide §2.3 "aggregate before you shuffle"): the
    argmin is a partial-aggregated ``min(struct(d2, cid))`` instead of
    the old row_number window — struct ordering compares d2 then cid,
    exactly the old ``orderBy("d2", "cid")`` rk==1 (ties included), and
    map-side combine collapses the K centroid rows per vector BEFORE
    the exchange, so each Lloyd round shuffles N rows instead of N×K
    window-sorted rows carrying the embedding payload.  ``first(emb)``
    is deterministic (every row in a vec_id group carries the identical
    embedding).  A fully map-side fold over a collected centroid array
    was measured SLOWER at the 10× tier — nested higher-order-function
    evaluation per row costs more than the avoided exchange
    (OPTIMIZATION_r13.md)."""
    d2 = F.round(
        F.aggregate(
            F.zip_with("emb", "cemb", lambda x, y: (x - y) * (x - y)),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ),
        6,
    )
    return (
        vecs.crossJoin(F.broadcast(centroids))
        .select("vec_id", "emb", "cid", d2.alias("d2"))
        .groupBy("vec_id")
        .agg(F.min(F.struct("d2", "cid")).alias("_best"), F.first("emb").alias("emb"))
        .select(
            "vec_id",
            "emb",
            F.col("_best.cid").alias("cid"),
            F.col("_best.d2").alias("d2"),
        )
    )


def _update(assigned: DataFrame, with_inertia: bool = False) -> DataFrame:
    """Recompute centroids: per-dimension DECIMAL mean, rounded to 6.

    ``with_inertia=True`` rides the round's inertia (Σ d2 per cluster)
    through the SAME aggregation — the d2 of every vector appears once
    per exploded dimension, so summing it over the pos==0 slice counts
    each vector exactly once.  This folds what used to be a separate
    full-scan ``agg(sum(d2))`` action into the centroid job (VERDICT
    r10 #6: one corpus-scale action per Lloyd round, not two).

    Optimization r13 note: a "one groupBy(cid) with {DIM} per-dimension
    DECIMAL sum columns" rewrite (removing this function's second
    exchange and the Generate) was implemented and REVERTED — 64 grouped
    decimal aggregate buffers de-optimize the hash aggregate and
    measured +40% at the 10× tier; the exploded single-sum shape is
    what codegen handles well (OPTIMIZATION_r13.md)."""
    explode_cols = ["cid"] + (["d2"] if with_inertia else [])
    per_dim = (
        assigned.select(*explode_cols, F.posexplode("emb").alias("pos", "x"))
        .groupBy("cid", "pos")
        .agg(
            F.round(
                F.sum(F.col("x").cast(_DEC)).cast("double") / F.count(F.lit(1)), 6
            ).alias("c"),
            *(
                [F.sum(F.when(F.col("pos") == 0, F.col("d2"))).alias("ip")]
                if with_inertia
                else []
            ),
        )
    )
    return per_dim.groupBy("cid").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "c"))), lambda s: s["c"]
        ).alias("cemb"),
        *([F.max("ip").alias("inertia_part")] if with_inertia else []),
    )


# DuckDB twin of one Lloyd round, as reusable SQL fragments.  Parallel
# unnest in one SELECT zips lists by position; lists are 1-indexed.
_ORACLE_VECS = f"""
vecs AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb
  FROM embeddings
),
init AS (
  SELECT vec_id AS cid, emb AS cemb
  FROM vecs ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT {K}
)"""


def _oracle_round(cent_cte: str, prefix: str, vecs_cte: str = "vecs") -> str:
    return f"""
{prefix}_flat AS (
  SELECT v.vec_id, c.cid, unnest(v.emb) AS vx, unnest(c.cemb) AS cx
  FROM {vecs_cte} v, {cent_cte} c
),
{prefix}_d AS (
  SELECT vec_id, cid, ROUND(SUM((vx - cx) * (vx - cx)), 6) AS d2
  FROM {prefix}_flat GROUP BY vec_id, cid
),
{prefix}_a AS (
  SELECT vec_id, cid, d2
  FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d2, cid) AS rk
        FROM {prefix}_d) t
  WHERE rk = 1
)"""


def _oracle_cent(assign_cte: str, name: str, vecs_cte: str = "vecs") -> str:
    """DuckDB twin of :func:`_update`, reading assignments from
    ``assign_cte`` and emitting centroid CTE ``name``."""
    return f"""
{name}_dim AS (
  SELECT a.cid, i,
         ROUND(CAST(SUM(CAST(v.emb[i] AS DECIMAL(18,12))) AS DOUBLE) / COUNT(*), 6) AS c
  FROM {assign_cte} a JOIN {vecs_cte} v USING (vec_id)
  CROSS JOIN generate_series(1, {DIM}) t(i)
  GROUP BY a.cid, i
),
{name} AS (SELECT cid, list(c ORDER BY i) AS cemb FROM {name}_dim GROUP BY cid)"""


_ORACLE_CENT1 = _oracle_cent("r0_a", "cent1")


@register(
    "kmeans_assign_embeddings",
    oracle=f"""
WITH {_ORACLE_VECS},
{_oracle_round('init', 'r0').lstrip()},
{_ORACLE_CENT1.lstrip()},
{_oracle_round('cent1', 'r1').lstrip()}
SELECT vec_id, cid AS cluster_id, d2 AS dist2 FROM r1_a
""",
)
def kmeans_assign_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One full Lloyd round, oracle-checked end-to-end: deterministic
    seeding → assignment → DECIMAL centroid update → re-assignment.
    Returns each vector's cluster and (rounded) squared distance after
    the update — every arithmetic step above is engine-stable, so DuckDB
    reproduces the exact assignment."""
    vecs = _vectors(spark, sf_dir)
    cents0 = _init_centroids(vecs)
    a0 = _assign(vecs, cents0)
    cents1 = _update(a0)
    a1 = _assign(vecs, cents1)
    return a1.select(
        "vec_id", F.col("cid").alias("cluster_id"), F.col("d2").alias("dist2")
    )


def lloyd(vecs: DataFrame, n_rounds: int = N_ROUNDS) -> tuple[DataFrame, list[float]]:
    """Run n_rounds of Lloyd's algorithm; return (final assignment,
    per-round inertia).  Driver-loop with per-round checkpoints — the
    inertia list doubles as the convergence trace tests assert on.

    ONE corpus-scale action per round: the assignment plan feeds the
    inertia-carrying centroid update directly (no intermediate
    checkpoint of the assignment), and the round's inertia is read back
    from the k-row checkpointed centroid frame — a k-row scan, not a
    second pass over the corpus.  The returned final assignment (against
    the LAST round's pre-update centroids, as before) is computed once
    after the loop."""
    centroids = _init_centroids(vecs).transform(materialize)
    inertia: list[float] = []
    prev = centroids
    for _ in range(n_rounds):
        prev = centroids
        cents_plus = _update(_assign(vecs, prev), with_inertia=True).transform(
            materialize
        )
        inertia.append(cents_plus.agg(F.sum("inertia_part")).collect()[0][0])
        centroids = cents_plus.select("cid", "cemb")
    assigned = _assign(vecs, prev).transform(materialize)
    return assigned, inertia


def _ivf_oracle() -> str:
    """DuckDB twin of ivf_cosine_topk: the 2-round Lloyd codebook via the
    proven round/centroid CTE pair, nprobe=2 probe lists per query, exact
    cosine + top-k on co-listed candidates only.  Promoted from rows-only
    in round 4 — "approximate" is recall vs cosine_topk (still asserted
    in tests), not nondeterminism."""
    from .similarity import _ORACLE_VECS as SIM_VECS, QUERY_MOD, TOP_K

    parts = [f"vecs AS ({SIM_VECS.strip()})", _oracle_init_dyn("vecs")]
    cent = "init"
    for r in range(2):
        parts.append(_oracle_round(cent, f"r{r}").strip())
        cent = f"cent{r + 1}"
        parts.append(_oracle_cent(f"r{r}_a", cent).strip())
    parts.append(_oracle_round(cent, "L").strip())  # final list assignment
    parts.append(f"""p_flat AS (
  SELECT v.vec_id, c.cid, unnest(v.emb) AS vx, unnest(c.cemb) AS cx
  FROM vecs v, {cent} c WHERE v.vec_id % {QUERY_MOD} = 0
),
p_d AS (
  SELECT vec_id, cid, ROUND(SUM((vx - cx) * (vx - cx)), 6) AS d2
  FROM p_flat GROUP BY vec_id, cid
),
p_a AS (
  SELECT vec_id, cid
  FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d2, cid) AS rk
        FROM p_d) t
  WHERE rk <= 2
),
cand AS (
  SELECT DISTINCT p.vec_id AS query_id, l.vec_id
  FROM p_a p JOIN L_a l ON l.cid = p.cid
  WHERE l.vec_id <> p.vec_id
),
flat AS (
  SELECT c.query_id, c.vec_id, vq.norm AS qn, vv.norm AS vn,
         unnest(vq.emb) AS qx, unnest(vv.emb) AS vx
  FROM cand c
  JOIN vecs vq ON vq.vec_id = c.query_id
  JOIN vecs vv ON vv.vec_id = c.vec_id
),
scored AS (
  SELECT query_id, vec_id,
         ROUND(SUM(qx * vx) / (ANY_VALUE(qn) * ANY_VALUE(vn)), 6) AS score
  FROM flat GROUP BY query_id, vec_id
),
ranked AS (
  SELECT query_id, vec_id, score,
         CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                                 ORDER BY score DESC, vec_id) AS INT) AS rank
  FROM scored
)""")
    return ("WITH " + ",\n".join(parts)
            + f"\nSELECT query_id, vec_id, score, rank FROM ranked WHERE rank <= {TOP_K}")


@register("ivf_cosine_topk", oracle=_ivf_oracle())
def ivf_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF approximate nearest-neighbor search: the k-means codebook as
    coarse quantizer (2 Lloyd rounds), exact cosine only within the
    query's ``nprobe=2`` nearest inverted lists.

    This is the second ANN family next to similarity.ann_cosine_lsh:
    LSH prunes by random-hyperplane bucket collision; IVF prunes by
    learned partition.  Plan shape: centroids always broadcast (k×dim
    doubles); list assignment is a map-side cross join; the probe joins
    the (tiny, broadcast) query table against candidates ON the list id
    — so the pair join is restricted to co-listed vectors, never Q·N.
    At 100 TB the inverted lists are the partitioning scheme: cluster
    by list id at write time and each query touches nprobe partitions.
    Recall vs the exact cosine_topk baseline is asserted in tests.
    """
    from .similarity import TOP_K, _dot, _norm, _vectors as _simvecs

    NPROBE = 2
    vecs = _vectors(spark, sf_dir)
    # cell count scales with the corpus (one O(1) driver scalar) so probe
    # cost per query is ~NPROBE x TARGET_CELL regardless of N — without
    # this the r6 scale stress measured 16x wall for 10x data
    cents = _init_centroids_dyn(vecs, dyn_k(vecs.count())).transform(materialize)
    for _ in range(2):  # 2 Lloyd rounds build the codebook — one action each
        cents = _update(_assign(vecs, cents)).transform(materialize)

    lists = _assign(vecs, cents).select("vec_id", F.col("cid").alias("list_id"))

    scored_vecs = _simvecs(spark, sf_dir)  # vec_id, label, emb, norm
    inv = scored_vecs.join(lists, "vec_id")

    queries = scored_vecs.filter(F.col("vec_id") % 50 == 0).select(
        F.col("vec_id").alias("query_id"),
        F.col("emb").alias("q_emb"),
        F.col("norm").alias("q_norm"),
    )
    # nprobe nearest lists per query (distance to centroid, same metric
    # as assignment), via the assignment helper on the query vectors
    q_vec = queries.select(F.col("query_id").alias("vec_id"), F.col("q_emb").alias("emb"))
    d2 = F.round(
        F.aggregate(
            F.zip_with("emb", "cemb", lambda x, y: (x - y) * (x - y)),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ),
        6,
    )
    w = Window.partitionBy("vec_id").orderBy("d2", "cid")
    probes = (
        q_vec.crossJoin(F.broadcast(cents))
        .select("vec_id", "cid", d2.alias("d2"))
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= NPROBE)
        .select(F.col("vec_id").alias("query_id"), F.col("cid").alias("list_id"))
    )

    cands = inv.join(
        F.broadcast(probes.join(queries, "query_id")), "list_id"
    ).filter(F.col("vec_id") != F.col("query_id"))
    score = F.round(
        _dot(F.col("q_emb"), F.col("emb")) / (F.col("q_norm") * F.col("norm")), 6
    )
    scored = cands.select("query_id", "vec_id", score.alias("score"))
    wq = Window.partitionBy("query_id").orderBy(F.col("score").desc(), "vec_id")
    return (
        scored.withColumn("rank", F.row_number().over(wq).cast("int"))
        .filter(F.col("rank") <= TOP_K)
        .select("query_id", "vec_id", "score", "rank")
    )


def _kmeans_oracle(n_rounds: int = N_ROUNDS) -> str:
    """The full Lloyd loop, unrolled into one DuckDB statement: every round
    is the SAME machine-generated (assign, update) CTE pair the 1-round
    ``kmeans_assign_embeddings`` oracle already proved, chained n_rounds
    deep.  Every arithmetic step is engine-stable (rounded fold distances,
    DECIMAL centroid means), so the unroll is exact, not approximate."""
    parts = [_ORACLE_VECS.strip()]
    cent = "init"
    for r in range(n_rounds):
        parts.append(_oracle_round(cent, f"r{r}").strip())
        if r < n_rounds - 1:
            cent = f"cent{r + 1}"
            parts.append(_oracle_cent(f"r{r}_a", cent).strip())
    return (
        "WITH "
        + ",\n".join(parts)
        + f"""
SELECT cid AS cluster_id, COUNT(*) AS n_members,
       ROUND(CAST(SUM(CAST(d2 AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*), 6) AS mean_dist2
FROM r{n_rounds - 1}_a GROUP BY cid"""
    )


@register("kmeans_embeddings", oracle=_kmeans_oracle())
def kmeans_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """{K}-means over embeddings, {N_ROUNDS} Lloyd rounds: per-cluster
    size and mean squared distance.  The driver loop is mirrored by an
    unrolled recursive-CTE-style oracle (see :func:`_kmeans_oracle`) —
    promoted from rows-only in round 4; tests/test_clustering.py still
    asserts the inertia trace is non-increasing and the result is
    run-stable."""
    from ..functions.numerics import davg

    assigned, _ = lloyd(_vectors(spark, sf_dir))
    return (
        assigned.groupBy(F.col("cid").alias("cluster_id"))
        .agg(
            F.count(F.lit(1)).alias("n_members"),
            F.round(davg(F.col("d2")), 6).alias("mean_dist2"),
        )
        .orderBy("cluster_id")
    )


# ---------------------------------------------------------------------------
# Greedy k-center coreset (farthest-point traversal) — data-pruning seed
# ---------------------------------------------------------------------------
K_CENTERS = 8


def _kcenter_oracle() -> str:
    """Unrolled greedy farthest-point traversal (K_CENTERS rounds): the
    same sequential argmax the Spark driver loop runs, as chained CTEs
    (the mmr_diverse_topk unrolling device).  Every CTE is MATERIALIZED:
    DuckDB inlines plain CTEs, and the s/m chains reference each other
    recursively — un-materialized, the inlined plan grows exponentially
    in K_CENTERS (measured: >200 s at K=8 vs 0.1 s materialized)."""
    parts = [
        """vecs AS MATERIALIZED (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb
  FROM embeddings
)""",
        """s1 AS MATERIALIZED (
  SELECT vec_id, emb FROM vecs
  ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT 1
)""",
    ]
    chosen = ["s1"]
    prev_min = None
    for i in range(2, K_CENTERS + 1):
        c = chosen[-1]
        flat = f"""f{i} AS MATERIALIZED (
  SELECT v.vec_id, unnest(v.emb) AS vx, unnest(c.emb) AS cx
  FROM vecs v, {c} c
)"""
        d = f"""d{i} AS MATERIALIZED (
  SELECT vec_id, ROUND(SUM((vx - cx) * (vx - cx)), 6) AS d
  FROM f{i} GROUP BY vec_id
)"""
        if prev_min is None:
            m = f"m{i} AS MATERIALIZED (SELECT vec_id, d FROM d{i})"
        else:
            m = f"""m{i} AS MATERIALIZED (
  SELECT p.vec_id, LEAST(p.d, d{i}.d) AS d
  FROM {prev_min} p JOIN d{i} USING (vec_id)
)"""
        excl = " UNION ALL ".join(f"SELECT vec_id FROM {s}" for s in chosen)
        s = f"""s{i} AS MATERIALIZED (
  SELECT v.vec_id, v.emb, m.d
  FROM m{i} m JOIN vecs v USING (vec_id)
  WHERE m.vec_id NOT IN ({excl})
  ORDER BY m.d DESC, m.vec_id LIMIT 1
)"""
        parts += [flat, d, m, s]
        chosen.append(f"s{i}")
        prev_min = f"m{i}"
    selects = ["SELECT 1 AS step, vec_id AS center_id, 0.0 AS sel_d2 FROM s1"] + [
        f"SELECT {i} AS step, vec_id AS center_id, d AS sel_d2 FROM s{i}"
        for i in range(2, K_CENTERS + 1)
    ]
    return "WITH " + ",\n".join(parts) + "\n" + "\nUNION ALL\n".join(selects)


@register("kcenter_coreset_sample", oracle=_kcenter_oracle())
def kcenter_coreset_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy k-center coreset over the embeddings: farthest-point
    traversal picks {K_CENTERS} maximally-spread vectors (seed = the
    md5-first vector, then repeatedly the point farthest from every
    chosen center).  The classic 2-approximation to the k-center
    cover — the coreset/data-pruning seed set a curation pipeline uses
    to cover the embedding space with few exemplars (and the init
    k-means++ approximates).  Emits (step, center_id, sel_d2): sel_d2
    is the coverage radius just before each pick, a non-increasing
    curve whose tail is the residual covering radius.

    Determinism: distances fold sequentially and ROUND to 6 before the
    argmax (ties break on vec_id) — the kmeans discipline; the oracle
    unrolls the identical greedy rounds as chained CTEs.

    Plan at 100 TB: each of the {K_CENTERS}-1 rounds is one map-side
    fold against ONE broadcast (literal) center + a 1-row argmax
    aggregate collected driver-side (the O(rounds) scalar pattern of
    kmeans/BPE); the running min-distance column is materialized per
    round, so the corpus is never shuffled and never self-joined."""
    vecs = _vectors(spark, sf_dir)
    seed = (
        vecs.select("vec_id", "emb", F.md5(F.col("vec_id").cast("string")).alias("h"))
        .orderBy("h", "vec_id")
        .limit(1)
        .collect()[0]
    )

    def _d2_to(center_emb) -> Column:
        lit = F.array(*[F.lit(float(v)) for v in center_emb])
        return F.round(
            F.aggregate(
                F.zip_with("emb", lit, lambda x, y: (x - y) * (x - y)),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ),
            6,
        )

    centers = [(1, int(seed["vec_id"]), 0.0)]
    mind = materialize(
        vecs.select("vec_id", "emb", _d2_to(seed["emb"]).alias("d"))
    )
    for step in range(2, K_CENTERS + 1):
        chosen_ids = [c[1] for c in centers]
        top = (
            mind.filter(~F.col("vec_id").isin(chosen_ids))
            .orderBy(F.desc("d"), "vec_id")
            .limit(1)
            .collect()[0]
        )
        centers.append((step, int(top["vec_id"]), float(top["d"])))
        mind = materialize(
            mind.select(
                "vec_id",
                "emb",
                F.least(F.col("d"), _d2_to(top["emb"])).alias("d"),
            )
        )
    return vecs.sparkSession.createDataFrame(
        centers, "step int, center_id bigint, sel_d2 double"
    )


# ---------------------------------------------------------------------------
# Power-iteration PCA: the top principal component of the embedding cloud
# ---------------------------------------------------------------------------
PCA_ITERS = 3


def _pca_oracle() -> str:
    """Unrolled power iteration as chained CTEs: mean-center, then
    v_{k+1} = normalize(Σ_i (x_i·v_k) x_i), every product rounded to 12
    before an order-independent DECIMAL sum and every vector element
    rounded to 9 after normalization — the pagerank discipline applied
    to a matvec, so both engines carry bit-identical vectors."""
    parts = [
        f"""WITH flat AS (
  SELECT vec_id, g.i AS d, CAST(embedding[g.i + 1] AS DOUBLE) AS x
  FROM embeddings CROSS JOIN (SELECT unnest(range(0, {DIM})) AS i) g
),
n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_rows FROM embeddings),
mean AS (
  SELECT d, ROUND(CAST(SUM(CAST(ROUND(x, 12) AS DECIMAL(28,12))) AS DOUBLE)
                  / n_rows, 9) AS m
  FROM flat CROSS JOIN n GROUP BY d, n_rows
),
c AS (
  SELECT flat.vec_id, flat.d, ROUND(flat.x - mean.m, 9) AS x
  FROM flat JOIN mean ON mean.d = flat.d
),
v0 AS (SELECT d, ROUND(1.0 / sqrt({DIM}), 9) AS v FROM (SELECT unnest(range(0, {DIM})) AS d))"""
    ]
    prev = "v0"
    for k in range(1, PCA_ITERS + 1):
        parts.append(
            f"""w{k}_dots AS (
  SELECT c.vec_id,
         CAST(SUM(CAST(ROUND(c.x * {prev}.v, 12) AS DECIMAL(28,12))) AS DOUBLE) AS dot
  FROM c JOIN {prev} ON {prev}.d = c.d GROUP BY c.vec_id
),
w{k} AS (
  SELECT c.d,
         CAST(SUM(CAST(ROUND(ROUND(t.dot, 12) * c.x, 12) AS DECIMAL(28,12))) AS DOUBLE) AS w
  FROM c JOIN w{k}_dots t ON t.vec_id = c.vec_id GROUP BY c.d
),
nrm{k} AS (
  SELECT ROUND(sqrt(CAST(SUM(CAST(ROUND(w * w, 12) AS DECIMAL(28,12))) AS DOUBLE)), 9) AS nn
  FROM w{k}
),
v{k} AS (
  SELECT d, ROUND(w / nn, 9) AS v FROM w{k} CROSS JOIN nrm{k}
)"""
        )
        prev = f"v{k}"
    # sign canonicalization: the component is defined up to sign, so flip
    # to make the largest-|loading| coordinate positive (ties: lowest d).
    parts.append(
        f"""pick AS (
  SELECT d AS pick_d, v AS pick_v FROM {prev}
  ORDER BY abs(v) DESC, d LIMIT 1
),
canon AS (
  SELECT {prev}.d, ROUND({prev}.v * CASE WHEN pick.pick_v < 0 THEN -1 ELSE 1 END, 9) AS loading
  FROM {prev} CROSS JOIN pick
)"""
    )
    return (
        ",\n".join(parts)
        + "\nSELECT CAST(d AS INT) AS dim, loading FROM canon ORDER BY dim"
    )


@register("pca_power_iteration_top", oracle=_pca_oracle())
def pca_power_iteration_top(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top principal component of the embedding cloud by {PCA_ITERS}
    power-iteration rounds — the decorrelation/whitening primitive an
    embedding pipeline runs before ANN indexing or drift analysis
    (dominant-direction removal is the standard fix for anisotropic
    embedding spaces).  Each round is one distributed matvec: per-vector
    dot with the current direction (a broadcast 64-float literal), then
    per-dimension accumulation of dot-weighted coordinates.

    Determinism (the pagerank discipline on a matvec): every product
    rounds to 12 before an order-independent DECIMAL sum; means,
    centered coordinates, and normalized vector elements round to 9; the
    final component's sign canonicalizes on the largest-|loading|
    coordinate, so both engines emit the identical vector even though
    eigenvectors are sign-ambiguous.

    Plan at 100 TB: the centered matrix is materialized ONCE in ARRAY
    form (vec_id, cx: array<double>), so each round is a single scan of
    it — the per-vector dot is an in-row fold against the broadcast
    64-float direction literal, and the per-dimension accumulation is
    one map-side-combined 64-key aggregate.  No join, no vec_id shuffle,
    no round ever exchanges more than |dims| × partitions rows (VERDICT
    r10 flagged the previous per-round dots-join re-shuffle; this
    removes the join entirely).  The direction vector lives on the
    driver between rounds (64 doubles — O(1), the
    logistic_regression_gd precedent), and every driver-side round uses
    round_half_up — bit-identical to F.round/DuckDB ROUND, where the
    builtin's half-even ties would diverge (ADVICE r10)."""
    import math

    from ..functions.numerics import dec_half_up, round_half_up

    vecs = _vectors(spark, sf_dir)
    dec = "decimal(28,12)"
    # Optimization r13 (guide §2.3/§2.4): the per-dimension sums used to
    # go through posexplode (64× the rows) into a 64-key hash exchange
    # plus a SEPARATE count() job.  One single-row aggregate — 64 decimal
    # sum columns + the row count — computes the same order-independent
    # DECIMAL sums map-side with no Generate and no keyed exchange; the
    # division and half-up rounds move to the driver, where
    # float(Decimal) ≡ the JVM's decimal→double cast (both round to
    # nearest) and round_half_up ≡ F.round — bit-identical means.
    mean_row = vecs.agg(
        F.count(F.lit(1)).alias("n"),
        *[
            F.sum(F.round(F.col("emb")[i], 12).cast(dec)).alias(f"s{i}")
            for i in range(DIM)
        ],
    ).collect()[0]
    n_rows = mean_row["n"]
    if n_rows == 0:
        # Empty corpus: the oracle's centered CTE is empty, every w/v CTE
        # after it is empty, and the final projection emits zero rows.
        return spark.createDataFrame([], "dim int, loading double")
    # ADVICE r13: guard a NULL per-dimension sum (null/short embedding
    # array) exactly like the sibling w-loop below — the old posexplode
    # shape defaulted such a dimension's mean to 0.0.
    mean = [
        round_half_up(float(s) / n_rows, 9) if s is not None else 0.0
        for s in (mean_row[f"s{i}"] for i in range(DIM))
    ]
    mean_lit = F.array(*[F.lit(float(mean[i])) for i in range(DIM)])
    centered = materialize(
        vecs.select(
            "vec_id",
            F.zip_with(
                "emb", mean_lit, lambda x, m: F.round(x - m, 9)
            ).alias("cx"),
        )
    )

    zero = F.lit(0).cast(dec)
    v = [round_half_up(1.0 / math.sqrt(DIM), 9)] * DIM
    for _ in range(PCA_ITERS):
        vlit = F.array(*[F.lit(float(x)) for x in v])
        # Per-vector dot: an in-row fold accumulating EXACT decimals of
        # the 12-dp-rounded products — the same order-independent sum the
        # oracle's DECIMAL SUM computes, with no vec_id aggregation at all.
        dot = F.round(
            F.aggregate(
                F.zip_with("cx", vlit, lambda x, vv: F.round(x * vv, 12)),
                zero,
                lambda acc, t: (acc + t.cast(dec)).cast(dec),
            ).cast("double"),
            12,
        )
        # 64 scalars per round — O(1) driver round, the GD precedent.
        # Same r13 shape as the mean: one single-row map-side aggregate
        # (no posexplode, no 64-key exchange); float(Decimal) driver-side
        # ≡ the JVM decimal→double cast the old plan ran per dimension.
        w_row = (
            centered.select(dot.alias("dot"), "cx")
            .agg(
                *[
                    F.sum(
                        F.round(F.col("dot") * F.col("cx")[i], 12).cast(dec)
                    ).alias(f"w{i}")
                    for i in range(DIM)
                ]
            )
            .collect()[0]
        )
        w = [
            float(w_row[f"w{i}"]) if w_row[f"w{i}"] is not None else 0.0
            for i in range(DIM)
        ]
        # Exact decimal sum of the engine-rounded w² terms, then the same
        # half-up rounds both engines apply.
        nn = round_half_up(
            math.sqrt(float(sum(dec_half_up(x * x, 12) for x in w))), 9
        )
        if nn == 0.0:
            # Single-vector or all-identical cloud: w is all zeros and the
            # oracle's v_k = ROUND(w / 0, 9) is NULL per element, which
            # stays NULL through every later CTE — emit the same NULL
            # loadings instead of raising ZeroDivisionError (ADVICE r10).
            return spark.createDataFrame(
                [(i, None) for i in range(DIM)], "dim int, loading double"
            ).orderBy("dim")
        v = [round_half_up(x / nn, 9) for x in w]
    pick = max(range(DIM), key=lambda i: (abs(v[i]), -i))
    sign = -1.0 if v[pick] < 0 else 1.0
    out = [(i, round_half_up(v[i] * sign, 9)) for i in range(DIM)]
    return spark.createDataFrame(out, "dim int, loading double").orderBy("dim")


# ---------------------------------------------------------------------------
# IVF index sizing planner: price nlist/nprobe BEFORE building the index
# ---------------------------------------------------------------------------
PLAN_NLISTS = (4, 8, 16, 32)
PLAN_NPROBES = (1, 2, 4)
PLAN_SAMPLE = 512  # deterministic training sample — the planner's FIXED cost


def _ivf_plan_oracle() -> str:
    """DuckDB twin: the same md5-ranked sample, per-nlist seed codebook,
    rounded-fold assignment, cell census, and probe-mass curve, unrolled
    per candidate nlist."""
    parts = [
        """vecs AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb
  FROM embeddings
)""",
        f"""sample AS MATERIALIZED (
  SELECT vec_id, emb FROM (
    SELECT vec_id, emb,
           ROW_NUMBER() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) AS rk
    FROM vecs) t
  WHERE rk <= {PLAN_SAMPLE}
)""",
        "sn AS (SELECT CAST(COUNT(*) AS BIGINT) AS s FROM sample)",
    ]
    max_p = max(PLAN_NPROBES)
    for k in PLAN_NLISTS:
        parts.append(f"""init{k} AS MATERIALIZED (
  SELECT vec_id AS cid, emb AS cemb
  FROM sample ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT {k}
),
flat{k} AS (
  SELECT s.vec_id, c.cid, unnest(s.emb) AS vx, unnest(c.cemb) AS cx
  FROM sample s, init{k} c
),
d{k} AS (
  SELECT vec_id, cid, ROUND(SUM((vx - cx) * (vx - cx)), 6) AS d2
  FROM flat{k} GROUP BY vec_id, cid
),
r{k} AS (
  SELECT vec_id, cid,
         ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d2, cid) AS rk
  FROM d{k}
),
sz{k} AS (
  SELECT cid, CAST(COUNT(*) AS BIGINT) AS n_c FROM r{k} WHERE rk = 1 GROUP BY cid
),
cellstats{k} AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_cells_used,
         CAST(MAX(n_c) AS BIGINT) AS max_c,
         CAST(SUM(n_c * n_c) AS BIGINT) AS sum_sq
  FROM sz{k}
),
probesum{k} AS (
  SELECT {", ".join(f"CAST(SUM(CASE WHEN r.rk <= {p} THEN z.n_c ELSE 0 END) AS BIGINT) AS c{p}" for p in PLAN_NPROBES)}
  FROM r{k} r LEFT JOIN sz{k} z USING (cid) WHERE r.rk <= {max_p}
),
met{k} AS (
  SELECT {k} AS nlist, cs.n_cells_used,
         ROUND(CAST(cs.max_c AS DOUBLE) / sn.s, 6) AS max_cell_share,
         ROUND({k} * CAST(cs.sum_sq AS DOUBLE) / (sn.s * sn.s), 6)
           AS imbalance_factor,
         {", ".join(f"ROUND(CAST(ps.c{p} AS DOUBLE) / (sn.s * sn.s), 6) AS scan_frac_p{p}" for p in PLAN_NPROBES)}
  FROM cellstats{k} cs, probesum{k} ps, sn
)""")
    union = "\nUNION ALL\n".join(f"SELECT * FROM met{k}" for k in PLAN_NLISTS)
    return "WITH " + ",\n".join(parts) + f"\n{union}\nORDER BY nlist"


@register("ivf_index_plan_curve", oracle=_ivf_plan_oracle())
def ivf_index_plan_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF index sizing planner — the ANN twin of the LSH banding planner
    (``lsh_band_plan_curve``): BEFORE paying for a full codebook build +
    inverted-list assignment over the corpus, price every candidate
    ``nlist`` in {PLAN_NLISTS} from a FIXED {PLAN_SAMPLE}-vector
    deterministic sample (md5-rank order, the engine's seeding device).
    Per nlist it reports the cell census (cells actually used, max cell
    share), the standard IVF imbalance factor nlist·Σ share² (1.0 =
    perfectly balanced; the expected slow-down multiplier of a random
    probe), and the measured scan fraction at nprobe ∈ {PLAN_NPROBES} —
    the fraction of the corpus a query would actually score.  A pipeline
    owner reads this curve to pick nlist/nprobe for the recall/cost
    target before committing the 100 TB index build.

    Determinism: the sample, seeds, rounded-fold distances, and argmin
    tiebreak are the proven kmeans devices; every reported metric reduces
    to exact integer counts divided once in double and rounded to 6 — no
    order-dependent float accumulation anywhere.

    Plan at 100 TB: the planner's cost is FIXED — {PLAN_SAMPLE} sampled
    vectors × at most {max(PLAN_NLISTS)} seed centroids, independent of
    corpus size (the sample is one md5-rank top-k over the vec_id/emb
    projection; everything after operates on ≤{PLAN_SAMPLE}·nlist rows).
    Like the banding planner, no inverted list is ever materialized."""
    vecs = _vectors(spark, sf_dir)
    # orderBy+limit plans as TakeOrderedAndProject (per-partition top-k,
    # then a k-row merge) — the scalable spelling of the md5-rank sample;
    # a global ROW_NUMBER window would sort the whole projection on one
    # partition.
    sample = materialize(
        vecs.select(
            "vec_id", "emb", F.md5(F.col("vec_id").cast("string")).alias("h")
        )
        .orderBy("h", "vec_id")
        .limit(PLAN_SAMPLE)
        .drop("h")
    )
    s = sample.count()  # O(1): ≤ PLAN_SAMPLE by construction
    max_p = max(PLAN_NPROBES)
    d2 = F.round(
        F.aggregate(
            F.zip_with("emb", "cemb", lambda x, y: (x - y) * (x - y)),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ),
        6,
    )
    mets = []
    for k in PLAN_NLISTS:
        cents = _init_centroids_dyn(sample, k)
        wv = Window.partitionBy("vec_id").orderBy("d2", "cid")
        ranked = (
            sample.crossJoin(F.broadcast(cents))
            .select("vec_id", "cid", d2.alias("d2"))
            .withColumn("rk", F.row_number().over(wv))
        )
        sizes = (
            ranked.filter(F.col("rk") == 1)
            .groupBy("cid")
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_c"))
        )
        cellstats = sizes.agg(
            F.count(F.lit(1)).cast("bigint").alias("n_cells_used"),
            F.max("n_c").cast("bigint").alias("max_c"),
            F.sum(F.col("n_c") * F.col("n_c")).cast("bigint").alias("sum_sq"),
        )
        probesum = (
            ranked.filter(F.col("rk") <= max_p)
            .join(sizes, "cid", "left")
            .agg(
                *[
                    F.sum(
                        F.when(F.col("rk") <= p, F.coalesce("n_c", F.lit(0)))
                        .otherwise(0)
                    )
                    .cast("bigint")
                    .alias(f"c{p}")
                    for p in PLAN_NPROBES
                ]
            )
        )
        mets.append(
            cellstats.crossJoin(probesum).select(
                F.lit(k).cast("int").alias("nlist"),
                "n_cells_used",
                F.round(F.col("max_c").cast("double") / s, 6).alias(
                    "max_cell_share"
                ),
                F.round(
                    F.lit(k) * F.col("sum_sq").cast("double") / (s * s), 6
                ).alias("imbalance_factor"),
                *[
                    F.round(
                        F.col(f"c{p}").cast("double") / (s * s), 6
                    ).alias(f"scan_frac_p{p}")
                    for p in PLAN_NPROBES
                ],
            )
        )
    out = mets[0]
    for m in mets[1:]:
        out = out.unionByName(m)
    return out.orderBy("nlist")
