"""Similarity search over the ``embeddings`` table (north-star extension).

The reference has no vector surface at all — this is the
similarity-search layer a training-data pipeline needs (SURVEY.md §2.3
``cosine_topk``; PAPERS.md top-k lines).  Three operators:

- **cosine_topk** — exact brute-force cosine top-k: every query vector
  scored against every candidate, ranked per query.  The O(Q·N) baseline
  every ANN variant is measured against.  All arithmetic is pure Catalyst
  (``zip_with`` + ``aggregate`` fold — no NumPy, no UDF), so it stays in
  whole-stage codegen; scores are rounded to 6 decimals so the DuckDB
  oracle hash is ulp-proof.
- **ann_cosine_lsh** — the scale path: random-hyperplane sign-LSH.  16
  deterministic md5-derived hyperplanes → 16 sign bits → 4 bands of 4
  bits; candidates share a band bucket (pigeonhole), exact cosine is then
  computed on candidates only.  At 100 TB the brute-force Q·N join is
  impossible; this plan's joins are all either broadcast (hyperplanes,
  query signatures) or bucketed (band values), so cost is Σ bucket².
- **embedding_norm_stats** — per-label vector-norm profile (the sanity
  scan run before any similarity job).

Query vectors are the rows with ``vec_id % 50 == 0`` — a deterministic
subset so both engines agree without a separate fixture.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import register
from ..sources.tables import load_spread

TOP_K = 5
QUERY_MOD = 50  # vec_id % QUERY_MOD == 0 → query vector

N_PLANES = 16
BAND_BITS = 4  # 4 bands of 4 sign bits

# Portable 16-bit hash (same alphabet-indexing trick as operators/dedup.py):
# identical in any engine with md5 + strpos, no conv() dependency.
_HEX = "0123456789abcdef"


def _as_double(arr: Column) -> Column:
    return F.transform(arr, lambda x: x.cast("double"))


def _dot(a: Column, b: Column) -> Column:
    """Sequential-fold dot product of two double arrays (deterministic)."""
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x)


def _norm(arr: Column) -> Column:
    return F.sqrt(_dot(arr, arr))


# Shared CTE: per-vector double embedding + L2 norm (computed ONCE per
# vector, not per pair — both engines must agree on that factoring).
_ORACLE_VECS = """
SELECT vec_id, label,
       list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb,
       sqrt(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS norm
FROM embeddings
"""


def _vectors(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_spread(spark, sf_dir, "embeddings")
    dbl = _as_double(F.col("embedding"))
    return emb.select("vec_id", "label", dbl.alias("emb"), _norm(dbl).alias("norm"))


@register(
    "cosine_topk",
    oracle=f"""
WITH vecs AS ({_ORACLE_VECS}),
q AS (SELECT vec_id AS query_id, emb AS q_emb, norm AS q_norm
      FROM vecs WHERE vec_id % {QUERY_MOD} = 0),
flat AS (
  SELECT q.query_id, v.vec_id, q.q_norm, v.norm,
         unnest(q.q_emb) AS qx, unnest(v.emb) AS vx
  FROM q JOIN vecs v ON v.vec_id <> q.query_id
),
scored AS (
  SELECT query_id, vec_id,
         ROUND(SUM(qx * vx) / (ANY_VALUE(q_norm) * ANY_VALUE(norm)), 6) AS score
  FROM flat GROUP BY query_id, vec_id
),
ranked AS (
  SELECT query_id, vec_id, score,
         CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                                 ORDER BY score DESC, vec_id) AS INT) AS rank
  FROM scored
)
SELECT query_id, vec_id, score, rank FROM ranked WHERE rank <= {TOP_K}
""",
)
def cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine top-{k}: brute-force score of every (query, candidate)
    pair, row_number window per query.

    Scale: the Q·N pair join broadcasts the query side (queries are always
    the small side by construction); the window partitions by query_id so
    no global sort exists.  Brute force is the *correctness baseline* —
    ann_cosine_lsh is the 100 TB plan.
    """
    vecs = _vectors(spark, sf_dir)
    q = (
        vecs.filter(F.col("vec_id") % QUERY_MOD == 0)
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("emb").alias("q_emb"),
            F.col("norm").alias("q_norm"),
        )
    )
    pairs = vecs.join(F.broadcast(q), F.col("vec_id") != F.col("query_id"))
    score = F.round(
        _dot(F.col("q_emb"), F.col("emb")) / (F.col("q_norm") * F.col("norm")), 6
    )
    scored = pairs.select("query_id", "vec_id", score.alias("score"))
    w = Window.partitionBy("query_id").orderBy(F.col("score").desc(), "vec_id")
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= TOP_K)
        .select("query_id", "vec_id", "score", "rank")
    )


def _hyperplanes(spark: SparkSession, dim: int) -> DataFrame:
    """(h, i, r) — N_PLANES deterministic pseudo-random hyperplanes with
    components in [-1, 1), derived from md5("hp|h|i") so any engine can
    reproduce them bit-for-bit."""
    h = spark.range(N_PLANES).select(F.col("id").cast("int").alias("h"))
    i = spark.range(dim).select(F.col("id").cast("int").alias("i"))
    key = F.md5(F.concat_ws("|", F.lit("hp"), F.col("h"), F.col("i")))
    parts = [
        (F.instr(F.lit(_HEX), F.substring(key, p + 1, 1)) - 1) * (16 ** (3 - p))
        for p in range(4)
    ]
    hv = parts[0]
    for p in parts[1:]:
        hv = hv + p
    return h.crossJoin(i).select("h", "i", (hv / F.lit(32768.0) - 1.0).alias("r"))


@register("ann_cosine_lsh")  # approximate by design → rows-only check
def ann_cosine_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate cosine top-k via random-hyperplane sign-LSH.

    Pipeline: posexplode vectors → broadcast-join the 16×dim hyperplane
    table → per-(vec, plane) partial-aggregated dot product → sign bit →
    16-bit signature → 4 band values of 4 bits.  Query signatures
    broadcast-join candidate band values; exact cosine runs only on the
    candidate set.  No all-pairs step anywhere — the 100 TB shape.

    Recall vs cosine_topk is asserted in tests (the banded prefilter
    keeps every pair whose signatures agree on ≥1 band).
    """
    vecs = _vectors(spark, sf_dir)
    dim = 64  # fixture embedding width (FIXTURES.md §B embeddings)
    hp = _hyperplanes(spark, dim)

    flat = vecs.select("vec_id", F.posexplode("emb").alias("i", "x"))
    bits = (
        flat.join(F.broadcast(hp), "i")
        .groupBy("vec_id", "h")
        .agg(F.when(F.sum(F.col("x") * F.col("r")) >= 0, 1).otherwise(0).alias("bit"))
    )
    sigs = bits.groupBy("vec_id").agg(
        F.sum(F.expr("shiftleft(bit, h)")).cast("int").alias("sig")
    )
    n_bands = N_PLANES // BAND_BITS
    band_range = spark.range(n_bands).select(F.col("id").cast("int").alias("band"))
    bands = sigs.crossJoin(F.broadcast(band_range)).select(
        "vec_id",
        "band",
        F.expr(f"shiftright(sig, band * {BAND_BITS})")
        .bitwiseAND(2**BAND_BITS - 1)
        .alias("band_val"),
    )

    q_bands = bands.filter(F.col("vec_id") % QUERY_MOD == 0).select(
        F.col("vec_id").alias("query_id"), "band", "band_val"
    )
    candidates = (
        bands.join(F.broadcast(q_bands), ["band", "band_val"])
        .filter(F.col("vec_id") != F.col("query_id"))
        .select("query_id", "vec_id")
        .distinct()
    )

    q = vecs.select(
        F.col("vec_id").alias("query_id"),
        F.col("emb").alias("q_emb"),
        F.col("norm").alias("q_norm"),
    )
    scored = (
        candidates.join(F.broadcast(q), "query_id")
        .join(vecs, "vec_id")
        .select(
            "query_id",
            "vec_id",
            F.round(
                _dot(F.col("q_emb"), F.col("emb")) / (F.col("q_norm") * F.col("norm")), 6
            ).alias("score"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("score").desc(), "vec_id")
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= TOP_K)
        .select("query_id", "vec_id", "score", "rank")
    )


@register(
    "embedding_norm_stats",
    oracle=f"""
WITH vecs AS ({_ORACLE_VECS})
SELECT label,
       COUNT(*) AS n_vecs,
       ROUND(MIN(norm), 6) AS min_norm,
       ROUND(MAX(norm), 6) AS max_norm,
       ROUND(CAST(SUM(CAST(norm AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*), 6) AS avg_norm
FROM vecs
GROUP BY label
ORDER BY label
""",
)
def embedding_norm_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label L2-norm profile of the embedding corpus (order-independent
    decimal mean so the value hash survives any aggregation tree)."""
    vecs = _vectors(spark, sf_dir)
    return (
        vecs.groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n_vecs"),
            F.round(F.min("norm"), 6).alias("min_norm"),
            F.round(F.max("norm"), 6).alias("max_norm"),
            F.round(F.sum(F.col("norm").cast("decimal(18,6)")).cast("double") / F.count(F.lit(1)), 6).alias(
                "avg_norm"
            ),
        )
        .orderBy("label")
    )


NEAR_DUP_COS = 0.5  # fixture embeddings are near-random; real corpora use ~0.95


@register(
    "embedding_near_dup_pairs",
    oracle=f"""
WITH vecs AS ({_ORACLE_VECS}),
flat AS (
  SELECT a.vec_id AS vec_a, b.vec_id AS vec_b, a.norm AS na, b.norm AS nb,
         unnest(a.emb) AS xa, unnest(b.emb) AS xb
  FROM vecs a JOIN vecs b ON a.vec_id < b.vec_id
),
scored AS (
  SELECT vec_a, vec_b,
         ROUND(SUM(xa * xb) / (ANY_VALUE(na) * ANY_VALUE(nb)), 6) AS cosine
  FROM flat GROUP BY vec_a, vec_b
)
SELECT vec_a, vec_b, cosine FROM scored WHERE cosine >= {NEAR_DUP_COS}
""",
)
def embedding_near_dup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (the vector-space member of
    the dedup family): all pairs with cosine ≥ {tau}.

    At fixture scale the all-pairs join is exact and cheap and lets the
    oracle verify values bit-for-bit; at 100 TB this operator composes
    the sign-LSH bucketing of ann_cosine_lsh as its candidate generator
    (identical plan shape to minhash_near_dedup → ngram_jaccard_dedup:
    bucketed candidates, exact verify) and feeds dedup finalization
    (connected_components) exactly like the text dedup pipeline.
    """
    # Materialize once: both join sides read the same normalized table.
    vecs = _vectors(spark, sf_dir).localCheckpoint(eager=True)
    a = vecs.select(
        F.col("vec_id").alias("vec_a"), F.col("emb").alias("emb_a"), F.col("norm").alias("na")
    )
    b = vecs.select(
        F.col("vec_id").alias("vec_b"), F.col("emb").alias("emb_b"), F.col("norm").alias("nb")
    )
    pairs = a.join(b, F.col("vec_a") < F.col("vec_b"))
    cosine = F.round(
        _dot(F.col("emb_a"), F.col("emb_b")) / (F.col("na") * F.col("nb")), 6
    )
    return (
        pairs.select("vec_a", "vec_b", cosine.alias("cosine"))
        .filter(F.col("cosine") >= NEAR_DUP_COS)
    )
