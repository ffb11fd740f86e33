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
  deterministic md5-derived hyperplanes (compiled as literal arrays into
  one map-side signature projection) → 16 sign bits → 4 bands of 4
  bits; candidates share a band bucket (pigeonhole), exact cosine is then
  computed on candidates only.  At 100 TB the brute-force Q·N join is
  impossible; this plan's joins are all either broadcast (query
  signatures) or bucketed (band values), so cost is Σ bucket².
- **embedding_norm_stats** — per-label vector-norm profile (the sanity
  scan run before any similarity job).

Query vectors are the rows with ``vec_id % 50 == 0`` — a deterministic
subset so both engines agree without a separate fixture.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..checkpointing import materialize
from ..functions.numerics import dsum
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
    """Sequential-fold dot product of two double arrays (deterministic).

    NOTE (r6): an unrolled 64-term element_at chain was tried and
    REVERTED — the giant expression tree made codegen/compile time the
    bottleneck (cosine_topk 0.75s -> 6s).  The higher-order fold is the
    right Spark idiom here."""
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


# NOTE: registered at the bottom of this module (register_ann_oracle) so
# the oracle can reuse _ORACLE_BANDS_CTES, which is defined below.
def ann_cosine_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate cosine top-k via random-hyperplane sign-LSH.

    Pipeline: 16-bit signature as ONE map-side projection (literal
    md5-derived hyperplanes folded per plane — no join, no shuffle, full
    codegen; see :func:`_sig_col`) → 4 band values of 4 bits via a
    literal-array explode → query signatures broadcast-join candidate
    band values → exact cosine only on the candidate set.  No all-pairs
    step and no nested-loop join anywhere (asserted in
    tests/test_plan_contracts.py) — the 100 TB shape.

    Recall vs cosine_topk is asserted in tests (the banded prefilter
    keeps every pair whose signatures agree on ≥1 band).
    """
    vecs = _vectors(spark, sf_dir)
    bands = _band_table(vecs, EMB_DIM)

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


# Fixture embeddings are near-random (real corpora use ~0.95); 0.4 keeps a
# few dozen true pairs at sf0.01 so the oracle hashes real rows, not ∅.
NEAR_DUP_COS = 0.4
EMB_DIM = 64  # fixture embedding width (FIXTURES.md §B embeddings)


def _plane_values(n_planes: int, dim: int) -> list[list[float]]:
    """Hyperplane components in [-1, 1) derived from md5("hp|h|i") — the
    SAME derivation the DuckDB oracle's planes CTE performs in SQL.  int(first-4-hex, 16) / 32768 - 1 is exact binary
    arithmetic (power-of-two denominator), so Python, Spark and DuckDB
    produce bit-identical doubles from the same md5 hex."""
    import hashlib

    return [
        [
            int(hashlib.md5(f"hp|{h}|{i}".encode()).hexdigest()[:4], 16) / 32768.0 - 1.0
            for i in range(dim)
        ]
        for h in range(n_planes)
    ]


def _sig_col(dim: int) -> Column:
    """16-bit sign-LSH signature of ``emb`` as ONE map-side projection:
    per plane, a sequential zip_with/aggregate fold (deterministic,
    partition-order independent), rounded to 6 decimals before the sign
    test so both engines agree at the boundary; bits packed via
    shiftleft.  Planes are constant literals — no join, no shuffle, full
    whole-stage codegen."""
    terms = []
    for h, plane in enumerate(_plane_values(N_PLANES, dim)):
        arr = ",".join(f"CAST('{v!r}' AS DOUBLE)" for v in plane)
        terms.append(
            f"shiftleft(CAST(round(aggregate(zip_with(emb, array({arr}),"
            f" (x, y) -> x * y), CAST(0 AS DOUBLE), (acc, x) -> acc + x), 6) >= 0"
            f" AS INT), {h})"
        )
    return F.expr("(" + " + ".join(terms) + ")").cast("int")


def _band_table(vecs: DataFrame, dim: int = EMB_DIM) -> DataFrame:
    """(vec_id, band, band_val): the sign-LSH band bucket memberships of
    every vector — signature as one map-side projection, bands via a
    literal-array explode (constant ×n_bands fan-out, no join)."""
    sig = vecs.select("vec_id", _sig_col(dim).alias("sig"))
    n_bands = N_PLANES // BAND_BITS
    band_structs = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.expr(f"shiftright(sig, {b * BAND_BITS})")
                .bitwiseAND(2**BAND_BITS - 1)
                .alias("band_val"),
            )
            for b in range(n_bands)
        ]
    )
    return sig.select("vec_id", F.explode(band_structs).alias("bb")).select(
        "vec_id", "bb.band", "bb.band_val"
    )


# Hot-bucket control for the embedding LSH pair join — same device as
# dedup.HOT_BUCKET_CAP: with only 2^BAND_BITS buckets per band, bucket
# occupancy grows linearly with N and the bucket self-join quadratically
# (measured 8x wall for 10x data, r6 scale stress).  Over-cap buckets
# emit a STAR around the bucket's min vec_id — linear fan-out, identical
# within-bucket connectivity.  Cap 128 leaves sf0.01 buckets (~12 avg)
# untouched, so driver-scale results are unchanged.  Mirrored in the
# oracle.  (The production-grade alternative — widening N_PLANES with N —
# changes the literal hyperplane set and is documented in SCALE.md.)
EMB_HOT_BUCKET_CAP = 128


def lsh_candidate_pairs(vecs: DataFrame, dim: int = EMB_DIM) -> DataFrame:
    """(vec_a < vec_b) candidate pairs sharing ≥1 sign-LSH band bucket,
    with hot buckets (> EMB_HOT_BUCKET_CAP members) star-capped.

    The only shuffle is the equi-join on (band, band_val) — cost is
    Σ min(bucket², cap·bucket) per band, never N²."""
    bands = _band_table(vecs, dim)
    w = Window.partitionBy("band", "band_val")
    sized = bands.select(
        "vec_id",
        "band",
        "band_val",
        F.count(F.lit(1)).over(w).alias("bucket_n"),
        F.min("vec_id").over(w).alias("anchor"),
    )
    small = sized.filter(F.col("bucket_n") <= EMB_HOT_BUCKET_CAP)
    a = small.select(F.col("vec_id").alias("vec_a"), "band", "band_val")
    b = small.select(F.col("vec_id").alias("vec_b"), "band", "band_val")
    pairs_small = (
        a.join(b, ["band", "band_val"])
        .filter(F.col("vec_a") < F.col("vec_b"))
        .select("vec_a", "vec_b")
    )
    pairs_star = (
        sized.filter(
            (F.col("bucket_n") > EMB_HOT_BUCKET_CAP)
            & (F.col("vec_id") != F.col("anchor"))
        )
        .select(F.col("anchor").alias("vec_a"), F.col("vec_id").alias("vec_b"))
    )
    return pairs_small.unionAll(pairs_star).distinct()


def near_dup_pairs_lsh(vecs: DataFrame, tau: float, dim: int = EMB_DIM) -> DataFrame:
    """Sign-LSH candidates + exact cosine verify ≥ tau — the 100 TB shape
    (mirror of minhash_near_dedup → ngram_jaccard_dedup: bucketed
    candidates, exact verify on candidates only)."""
    vecs = vecs.transform(materialize)  # sig scan + two verify joins reuse it
    cand = lsh_candidate_pairs(vecs, dim)
    va = vecs.select(
        F.col("vec_id").alias("vec_a"), F.col("emb").alias("emb_a"), F.col("norm").alias("na")
    )
    vb = vecs.select(
        F.col("vec_id").alias("vec_b"), F.col("emb").alias("emb_b"), F.col("norm").alias("nb")
    )
    cosine = F.round(
        _dot(F.col("emb_a"), F.col("emb_b")) / (F.col("na") * F.col("nb")), 6
    )
    return (
        cand.join(va, "vec_a")
        .join(vb, "vec_b")
        .select("vec_a", "vec_b", cosine.alias("cosine"))
        .filter(F.col("cosine") >= tau)
    )


def near_dup_pairs_allpairs(vecs: DataFrame, tau: float) -> DataFrame:
    """Exact all-pairs ground truth (O(N²) BroadcastNestedLoopJoin) —
    NOT registered; fixture-scale only, used by the containment pytest
    to measure the LSH composition's recall."""
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
        .filter(F.col("cosine") >= tau)
    )


# DuckDB reproduces the ENTIRE LSH pipeline — planes from md5, rounded
# projections, sign bits, band buckets — so the oracle value-checks the
# exact candidate set the Spark plan produces, not a looser superset.
_N_BANDS = N_PLANES // BAND_BITS
_ORACLE_MD5 = "md5('hp|' || hs.range || '|' || isq.range)"
_ORACLE_PLANE_R = " + ".join(
    f"(strpos('{_HEX}', substr({_ORACLE_MD5}, {p + 1}, 1)) - 1) * {16 ** (3 - p)}"
    for p in range(4)
)


# The full deterministic sign-LSH chain (hyperplanes → projections →
# sign bits → band values), shared by the near-dup and ANN-top-k oracles.
_ORACLE_BANDS_CTES = f"""planes AS (
  SELECT CAST(hs.range AS INT) AS h, CAST(isq.range AS INT) AS i,
         ({_ORACLE_PLANE_R}) / 32768.0 - 1.0 AS r
  FROM range({N_PLANES}) hs, range({EMB_DIM}) isq
),
proj AS (
  SELECT v.vec_id, p.h, ROUND(SUM(v.emb[p.i + 1] * p.r), 6) AS pr
  FROM vecs v CROSS JOIN planes p
  GROUP BY v.vec_id, p.h
),
sigs AS (
  SELECT vec_id, CAST(SUM(CASE WHEN pr >= 0 THEN 1 << h ELSE 0 END) AS INT) AS sig
  FROM proj GROUP BY vec_id
),
bands AS (
  SELECT s.vec_id, CAST(b.range AS INT) AS band,
         (s.sig >> CAST(b.range * {BAND_BITS} AS INT)) & {2**BAND_BITS - 1} AS band_val
  FROM sigs s, range({_N_BANDS}) b
)"""


@register(
    "embedding_near_dup_pairs",
    oracle=f"""
WITH vecs AS ({_ORACLE_VECS}),
{_ORACLE_BANDS_CTES},
sized AS (
  SELECT vec_id, band, band_val,
         COUNT(*) OVER (PARTITION BY band, band_val) AS bucket_n,
         MIN(vec_id) OVER (PARTITION BY band, band_val) AS anchor
  FROM bands
),
cand AS (
  SELECT DISTINCT vec_a, vec_b FROM (
    SELECT a.vec_id AS vec_a, b.vec_id AS vec_b
    FROM sized a
    JOIN sized b ON a.band = b.band AND a.band_val = b.band_val
               AND a.vec_id < b.vec_id
    WHERE a.bucket_n <= {EMB_HOT_BUCKET_CAP}
    UNION ALL
    SELECT anchor AS vec_a, vec_id AS vec_b
    FROM sized WHERE bucket_n > {EMB_HOT_BUCKET_CAP} AND vec_id <> anchor
  ) u
),
flat AS (
  SELECT c.vec_a, c.vec_b, va.norm AS na, vb.norm AS nb,
         unnest(va.emb) AS xa, unnest(vb.emb) AS xb
  FROM cand c
  JOIN vecs va ON va.vec_id = c.vec_a
  JOIN vecs vb ON vb.vec_id = c.vec_b
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
    the dedup family), in the 100 TB shape: sign-LSH band buckets
    generate candidates (the only shuffle is an equi-join on
    (band, band_val) — no N² nested-loop anywhere), exact cosine verify
    keeps pairs ≥ {tau}.  The oracle reproduces the identical
    deterministic LSH filter in DuckDB, so this is a full value-hash
    check, not rows-only; recall vs the all-pairs ground truth is
    asserted separately in tests/test_similarity.py."""
    return near_dup_pairs_lsh(_vectors(spark, sf_dir), NEAR_DUP_COS)


# ann_cosine_lsh promoted from rows-only in round 4: every step of the
# LSH prefilter is deterministic (md5-derived literal hyperplanes,
# rounded projections), so the ORACLE reproduces the exact candidate set
# and the top-k over it — "approximate" refers to recall vs cosine_topk
# (still asserted in tests), not to any nondeterminism.
register(
    "ann_cosine_lsh",
    oracle=f"""
WITH vecs AS ({_ORACLE_VECS}),
{_ORACLE_BANDS_CTES},
qb AS (SELECT vec_id AS query_id, band, band_val FROM bands
       WHERE vec_id % {QUERY_MOD} = 0),
cand AS (
  SELECT DISTINCT q.query_id, b.vec_id
  FROM bands b JOIN qb q ON b.band = q.band AND b.band_val = q.band_val
  WHERE b.vec_id <> q.query_id
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
)
SELECT query_id, vec_id, score, rank FROM ranked WHERE rank <= {TOP_K}
""",
)(ann_cosine_lsh)


# ---------------------------------------------------------------------------
# ANN quality audit: recall@k of the sign-LSH plan vs the exact top-k —
# "measure, don't guess" applied to the index itself.
# ---------------------------------------------------------------------------
_ORACLE_EXACT_TOPK = f"""
flat_e AS (
  SELECT q.vec_id AS query_id, v.vec_id, q.norm AS qn, v.norm AS vn,
         unnest(q.emb) AS qx, unnest(v.emb) AS vx
  FROM vecs q JOIN vecs v ON v.vec_id <> q.vec_id
  WHERE q.vec_id % {QUERY_MOD} = 0
),
scored_e AS (
  SELECT query_id, vec_id,
         ROUND(SUM(qx * vx) / (ANY_VALUE(qn) * ANY_VALUE(vn)), 6) AS score
  FROM flat_e GROUP BY query_id, vec_id
),
topk_e AS (
  SELECT query_id, vec_id FROM (
    SELECT query_id, vec_id,
           ROW_NUMBER() OVER (PARTITION BY query_id
                              ORDER BY score DESC, vec_id) AS rank
    FROM scored_e)
  WHERE rank <= {TOP_K}
)"""

_ORACLE_ANN_TOPK = f"""
qb AS (SELECT vec_id AS query_id, band, band_val FROM bands
       WHERE vec_id % {QUERY_MOD} = 0),
cand AS (
  SELECT DISTINCT q.query_id, b.vec_id
  FROM bands b JOIN qb q ON b.band = q.band AND b.band_val = q.band_val
  WHERE b.vec_id <> q.query_id
),
flat_a AS (
  SELECT c.query_id, c.vec_id, vq.norm AS qn, vv.norm AS vn,
         unnest(vq.emb) AS qx, unnest(vv.emb) AS vx
  FROM cand c
  JOIN vecs vq ON vq.vec_id = c.query_id
  JOIN vecs vv ON vv.vec_id = c.vec_id
),
scored_a AS (
  SELECT query_id, vec_id,
         ROUND(SUM(qx * vx) / (ANY_VALUE(qn) * ANY_VALUE(vn)), 6) AS score
  FROM flat_a GROUP BY query_id, vec_id
),
topk_a AS (
  SELECT query_id, vec_id FROM (
    SELECT query_id, vec_id,
           ROW_NUMBER() OVER (PARTITION BY query_id
                              ORDER BY score DESC, vec_id) AS rank
    FROM scored_a)
  WHERE rank <= {TOP_K}
)"""


@register(
    "ann_recall_audit",
    oracle=f"""
WITH vecs AS ({_ORACLE_VECS}),
{_ORACLE_BANDS_CTES},
{_ORACLE_EXACT_TOPK},
{_ORACLE_ANN_TOPK}
SELECT e.query_id,
       CAST(COUNT(a.vec_id) AS BIGINT) AS n_hits,
       ROUND(CAST(COUNT(a.vec_id) AS DOUBLE) / {TOP_K}, 6) AS recall
FROM topk_e e
LEFT JOIN topk_a a ON a.query_id = e.query_id AND a.vec_id = e.vec_id
GROUP BY e.query_id
ORDER BY e.query_id
""",
)
def ann_recall_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@{k} of the sign-LSH index against the exact brute-force
    top-{k}, per query — the statistic that decides whether an ANN
    index ships.  Both rankings are computed by the registered plans
    themselves (``cosine_topk`` / ``ann_cosine_lsh``), so the audit
    measures exactly what users run, and the DuckDB oracle reproduces
    both pipelines end-to-end (full value-hash check of an ANN
    quality metric — not a tolerance test).

    Scale: the exact side is the expensive O(Q·N) leg, which is the
    point — the audit runs on a SAMPLED query set (here the
    deterministic ``vec_id % {{QUERY_MOD}}`` probes), never the full
    corpus; the LSH side costs what production costs.  The final join
    is per-(query, vec) equi-keyed on the tiny top-k tables.
    """
    exact = cosine_topk(spark, sf_dir).select("query_id", "vec_id")
    ann = ann_cosine_lsh(spark, sf_dir).select(
        "query_id", "vec_id", F.lit(1).alias("hit")
    )
    return (
        exact.join(ann, ["query_id", "vec_id"], "left")
        .groupBy("query_id")
        .agg(
            F.count("hit").alias("n_hits"),
            F.round(F.count("hit").cast("double") / TOP_K, 6).alias("recall"),
        )
        .orderBy("query_id")
    )


# ---------------------------------------------------------------------------
# Matryoshka truncation audit: how much L2 energy survives prefix-dim
# truncation (Kusupati et al. 2022, "Matryoshka Representation Learning") —
# the measurement behind shipping 8/16/32-dim prefixes of a 64-dim model.
# ---------------------------------------------------------------------------
MATRYOSHKA_DIMS = (8, 16, 32)


@register(
    "matryoshka_truncation_stats",
    oracle=f"""
WITH vecs AS (
  SELECT vec_id, label,
         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb
  FROM embeddings
),
e AS (
  SELECT vec_id, label,
         list_sum(list_transform(emb, x -> x * x)) AS full_energy, emb
  FROM vecs
),
r AS (
  SELECT label, CAST(d.range AS INT) AS dim,
         ROUND(list_sum(list_transform(emb[1:CAST(d.range AS INT)],
                                       x -> x * x)) / full_energy, 6)
           AS retained
  FROM e, range({min(MATRYOSHKA_DIMS)}, {max(MATRYOSHKA_DIMS) + 1}) d
  WHERE CAST(d.range AS INT) IN {MATRYOSHKA_DIMS!r}
)
SELECT label, dim,
       CAST(COUNT(*) AS BIGINT) AS n_vecs,
       ROUND(CAST(SUM(CAST(retained AS DECIMAL(18,6))) AS DOUBLE)
             / COUNT(*), 6) AS avg_retained,
       ROUND(MIN(retained), 6) AS min_retained
FROM r GROUP BY label, dim ORDER BY label, dim
""",
)
def matryoshka_truncation_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-(label, prefix-dim) L2-energy retention of truncated
    embeddings: retained(d) = ||x[:d]||² / ||x||², averaged with the
    DECIMAL-accumulation discipline.  This is the audit that justifies
    serving an 8/16/32-dim Matryoshka prefix instead of the full
    vector (4-8x cheaper ANN at a measured quality cost).

    Scale: map-only — prefix energies are sequential folds over array
    slices (whole-stage codegen, zero Python, zero join); the only
    shuffle is the tiny (label, dim) groupBy with map-side combine.
    At 100 TB this is one pass over the embedding column.
    """
    vecs = _vectors(spark, sf_dir)
    dims = F.array(*[F.lit(d) for d in MATRYOSHKA_DIMS])
    sq = lambda arr: F.aggregate(  # noqa: E731 — local fold helper
        arr, F.lit(0.0), lambda acc, x: acc + x * x
    )
    # full energy is the DIRECT fold of squares (NOT norm*norm — squaring
    # the sqrt would differ from the oracle's list_sum in the last ulp)
    r = (
        vecs.select(
            "label",
            sq(F.col("emb")).alias("full_energy"),
            "emb",
        )
        .select("label", "full_energy", "emb", F.explode(dims).alias("dim"))
        .select(
            "label",
            F.col("dim").cast("int").alias("dim"),
            F.round(
                sq(F.slice("emb", F.lit(1), F.col("dim"))) / F.col("full_energy"), 6
            ).alias("retained"),
        )
    )
    return (
        r.groupBy("label", "dim")
        .agg(
            F.count(F.lit(1)).alias("n_vecs"),
            F.round(
                F.sum(F.col("retained").cast("decimal(18,6)")).cast("double")
                / F.count(F.lit(1)),
                6,
            ).alias("avg_retained"),
            F.round(F.min("retained"), 6).alias("min_retained"),
        )
        .orderBy("label", "dim")
    )


# ---------------------------------------------------------------------------
# Johnson-Lindenstrauss random-projection distortion audit
# ---------------------------------------------------------------------------
JL_OUT_DIM = 16  # project 64 -> 16; scale 1/sqrt(16) = 0.25 (exact binary)
JL_QUERY_MOD = 25  # vec_id % 25 == 0 -> sampled left side of each pair


def _jl_sign_planes() -> list[list[float]]:
    """±1 projection rows derived from md5("jl|j|i") — the sign of the
    same exact-binary [-1, 1) derivation the LSH hyperplanes use, so
    Python/Spark/DuckDB agree bit-for-bit."""
    import hashlib

    return [
        [
            1.0
            if int(hashlib.md5(f"jl|{j}|{i}".encode()).hexdigest()[:4], 16) / 32768.0
            - 1.0
            >= 0
            else -1.0
            for i in range(EMB_DIM)
        ]
        for j in range(JL_OUT_DIM)
    ]


def _jl_proj_col() -> Column:
    """All {JL_OUT_DIM} projection components as one array column: per
    output dim a sequential zip_with/aggregate fold against a ±1 literal
    row, rounded to 6 then scaled by the exact 0.25 — pure map-side
    Catalyst, whole-stage codegen, no shuffle."""
    comps = []
    for row in _jl_sign_planes():
        arr = ",".join(f"CAST({v!r} AS DOUBLE)" for v in row)
        comps.append(
            f"round(aggregate(zip_with(emb, array({arr}),"
            f" (x, y) -> x * y), CAST(0 AS DOUBLE), (acc, x) -> acc + x), 6) * 0.25"
        )
    return F.expr("array(" + ", ".join(comps) + ")")


_ORACLE_JL_MD5 = "md5('jl|' || CAST(js.range AS VARCHAR) || '|' || CAST(isq.range AS VARCHAR))"
_ORACLE_JL_R = " + ".join(
    f"(strpos('{_HEX}', substr({_ORACLE_JL_MD5}, {p + 1}, 1)) - 1) * {16 ** (3 - p)}"
    for p in range(4)
)


@register(
    "jl_projection_distortion",
    oracle=f"""
WITH vecs AS ({_ORACLE_VECS}),
planes AS (
  SELECT CAST(js.range AS INT) AS j, CAST(isq.range AS INT) AS i,
         CASE WHEN ({_ORACLE_JL_R}) / 32768.0 - 1.0 >= 0 THEN 1.0 ELSE -1.0 END AS r
  FROM range({JL_OUT_DIM}) js, range({EMB_DIM}) isq
),
proj AS (
  SELECT v.vec_id, p.j, ROUND(SUM(v.emb[p.i + 1] * p.r), 6) * 0.25 AS pj
  FROM vecs v CROSS JOIN planes p
  GROUP BY v.vec_id, p.j
),
pairs AS (
  SELECT q.vec_id AS qa, v.vec_id AS qb
  FROM vecs q JOIN vecs v ON v.vec_id <> q.vec_id
  WHERE q.vec_id % {JL_QUERY_MOD} = 0
),
od AS (
  SELECT p.qa, p.qb, ROUND(SUM((xa - xb) * (xa - xb)), 6) AS do2
  FROM (SELECT pr.qa, pr.qb, unnest(va.emb) AS xa, unnest(vb.emb) AS xb
        FROM pairs pr
        JOIN vecs va ON va.vec_id = pr.qa
        JOIN vecs vb ON vb.vec_id = pr.qb) p
  GROUP BY p.qa, p.qb
),
pd AS (
  SELECT pr.qa, pr.qb, ROUND(SUM((a.pj - b.pj) * (a.pj - b.pj)), 6) AS dp2
  FROM pairs pr
  JOIN proj a ON a.vec_id = pr.qa
  JOIN proj b ON b.vec_id = pr.qb AND b.j = a.j
  GROUP BY pr.qa, pr.qb
),
ratios AS (
  SELECT od.qa, od.qb, ROUND(pd.dp2 / od.do2, 6) AS ratio
  FROM od JOIN pd ON pd.qa = od.qa AND pd.qb = od.qb
)
SELECT CAST(FLOOR(ratio * 10) AS INT) AS bucket,
       CAST(COUNT(*) AS BIGINT) AS n_pairs,
       ROUND(CAST(SUM(CAST(ratio AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*), 6)
         AS mean_ratio,
       MIN(ratio) AS min_ratio, MAX(ratio) AS max_ratio
FROM ratios GROUP BY 1
""",
)
def jl_projection_distortion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Johnson-Lindenstrauss audit: project {EMB_DIM}-d embeddings to
    {JL_OUT_DIM}-d with a deterministic ±1/sqrt({JL_OUT_DIM}) sign
    matrix and histogram the squared-distance distortion ratio
    d_proj²/d_orig² over sampled pairs — the measurement that tells you
    whether a cheap projected index (or projected dedup prefilter) is
    faithful enough before you pay for it at corpus scale.  The JL bound
    says ratios concentrate near 1 with spread ~sqrt(2/{JL_OUT_DIM}).

    Plan at 100 TB: the projection is one map-side fold per output dim
    against literal rows (no shuffle, no matrix table); pair sampling is
    a pushed-down modulus filter on one side, so the distance join is
    |sample| × N broadcast-shaped, never N²."""
    vecs = materialize(
        _vectors(spark, sf_dir).select("vec_id", "emb", _jl_proj_col().alias("proj"))
    )
    q = vecs.filter(F.col("vec_id") % JL_QUERY_MOD == 0).select(
        F.col("vec_id").alias("qa"),
        F.col("emb").alias("emb_a"),
        F.col("proj").alias("proj_a"),
    )
    pairs = q.join(
        vecs.select(
            F.col("vec_id").alias("qb"),
            F.col("emb").alias("emb_b"),
            F.col("proj").alias("proj_b"),
        ),
        F.col("qb") != F.col("qa"),
    )
    # Tie-safety (r6 ask #2 audit): both ROUND sites here take a DOUBLE
    # (sums of squared float32 diffs / their ratio — dense-mantissa,
    # transcendental-free but never 2^-k-aligned), and both engines round
    # the DOUBLE path half-away-from-zero (verified: Spark
    # round(0.0078125, 6) == DuckDB round(0.0078125::DOUBLE, 6) ==
    # 0.007813), so even an exact digit-7 decimal tie agrees.  The ewma
    # hazard class — a DECIMAL-typed exact product rounded under DuckDB's
    # decimal semantics against Spark's double — cannot arise: no decimal
    # product is rounded on either side of this query.
    sqdist = lambda a, b: F.round(  # noqa: E731
        F.aggregate(
            F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ),
        6,
    )
    ratios = pairs.select(
        F.round(
            sqdist(F.col("proj_a"), F.col("proj_b"))
            / sqdist(F.col("emb_a"), F.col("emb_b")),
            6,
        ).alias("ratio")
    )
    return ratios.groupBy(
        F.floor(F.col("ratio") * 10).cast("int").alias("bucket")
    ).agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.round(dsum(F.col("ratio")) / F.count(F.lit(1)), 6).alias("mean_ratio"),
        F.min("ratio").alias("min_ratio"),
        F.max("ratio").alias("max_ratio"),
    )


# ---------------------------------------------------------------------------
# kNN label-vote classifier accuracy (the standard embedding-quality probe)
# ---------------------------------------------------------------------------
KNN_K = 5


@register(
    "knn_label_accuracy",
    oracle=f"""
WITH vecs AS ({_ORACLE_VECS}),
q AS (SELECT vec_id AS query_id, label AS true_label, emb AS q_emb, norm AS q_norm
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
nn AS (
  SELECT s.query_id, v.label
  FROM (SELECT query_id, vec_id,
               ROW_NUMBER() OVER (PARTITION BY query_id
                                  ORDER BY score DESC, vec_id) AS rank
        FROM scored) s
  JOIN vecs v ON v.vec_id = s.vec_id
  WHERE s.rank <= {KNN_K}
),
votes AS (
  SELECT query_id, label AS pred_label, COUNT(*) AS n_votes,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY COUNT(*) DESC, label) AS rk
  FROM nn GROUP BY query_id, label
),
pred AS (
  SELECT q.true_label, v.pred_label
  FROM q JOIN votes v ON v.query_id = q.query_id AND v.rk = 1
)
SELECT true_label,
       CAST(COUNT(*) AS BIGINT) AS n_queries,
       CAST(SUM(CASE WHEN pred_label = true_label THEN 1 ELSE 0 END) AS BIGINT)
         AS n_correct,
       ROUND(CAST(SUM(CASE WHEN pred_label = true_label THEN 1 ELSE 0 END)
                  AS DOUBLE) / COUNT(*), 6) AS accuracy
FROM pred GROUP BY true_label
""",
)
def knn_label_accuracy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-NN classifier accuracy over the labeled embeddings: each query
    vector is classified by majority label of its {KNN_K} nearest cosine
    neighbors (ties to the lexicographically smallest label) and scored
    against its own label, per true label — THE standard probe for
    whether an embedding space separates its classes, run before anyone
    trusts those vectors for clustering or retrieval.

    Plan at 100 TB: identical join shape to cosine_topk (query side
    broadcast, per-query window — no global sort); the vote and accuracy
    stages operate on Q×{KNN_K} rows.  Swap the brute-force neighbor
    stage for the LSH/IVF candidate generators when N explodes — the
    vote logic is unchanged."""
    vecs = _vectors(spark, sf_dir)
    q = vecs.filter(F.col("vec_id") % QUERY_MOD == 0).select(
        F.col("vec_id").alias("query_id"),
        F.col("label").alias("true_label"),
        F.col("emb").alias("q_emb"),
        F.col("norm").alias("q_norm"),
    )
    pairs = vecs.join(F.broadcast(q), F.col("vec_id") != F.col("query_id"))
    score = F.round(
        _dot(F.col("q_emb"), F.col("emb")) / (F.col("q_norm") * F.col("norm")), 6
    )
    scored = pairs.select("query_id", "vec_id", "label", score.alias("score"))
    wnn = Window.partitionBy("query_id").orderBy(F.col("score").desc(), "vec_id")
    nn = (
        scored.withColumn("rank", F.row_number().over(wnn))
        .filter(F.col("rank") <= KNN_K)
        .select("query_id", "label")
    )
    wv = Window.partitionBy("query_id").orderBy(F.col("n_votes").desc(), "pred_label")
    pred = (
        nn.groupBy("query_id", F.col("label").alias("pred_label"))
        .agg(F.count(F.lit(1)).alias("n_votes"))
        .withColumn("rk", F.row_number().over(wv))
        .filter(F.col("rk") == 1)
        .join(q.select("query_id", "true_label"), "query_id")
    )
    correct = F.sum(
        F.when(F.col("pred_label") == F.col("true_label"), 1).otherwise(0)
    )
    return pred.groupBy("true_label").agg(
        F.count(F.lit(1)).alias("n_queries"),
        correct.cast("bigint").alias("n_correct"),
        F.round(correct.cast("double") / F.count(F.lit(1)), 6).alias("accuracy"),
    )


# ---------------------------------------------------------------------------
# Matryoshka (MRL) prefix-dimension retrieval audit
# ---------------------------------------------------------------------------
MRL_DIM = 8  # prefix dimensions scored in the cheap first pass


@register(
    "matryoshka_prefix_recall",
    oracle=f"""
WITH vecs AS ({{vecs}}),
q AS (SELECT vec_id AS query_id, emb AS q_emb, norm AS q_norm
      FROM vecs WHERE vec_id % {{mod}} = 0),
flat AS (
  SELECT q.query_id, v.vec_id, q.q_norm, v.norm, q.q_emb, v.emb,
         unnest(q.q_emb) AS qx, unnest(v.emb) AS vx
  FROM q JOIN vecs v ON v.vec_id <> q.query_id
),
full_scored AS (
  SELECT query_id, vec_id,
         ROUND(SUM(qx * vx) / (ANY_VALUE(q_norm) * ANY_VALUE(norm)), 6) AS score
  FROM flat GROUP BY query_id, vec_id
),
full_top AS (
  SELECT query_id, vec_id FROM (
    SELECT query_id, vec_id,
           ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY score DESC, vec_id) AS rk
    FROM full_scored) t WHERE rk <= {{k}}
),
pflat AS (
  SELECT q.query_id, v.vec_id,
         unnest(q.q_emb[1:{MRL_DIM}]) AS qx, unnest(v.emb[1:{MRL_DIM}]) AS vx
  FROM q JOIN vecs v ON v.vec_id <> q.query_id
),
pre_scored AS (
  SELECT query_id, vec_id,
         ROUND(SUM(qx * vx)
               / (sqrt(SUM(qx * qx)) * sqrt(SUM(vx * vx))), 6) AS score
  FROM pflat GROUP BY query_id, vec_id
),
pre_top AS (
  SELECT query_id, vec_id FROM (
    SELECT query_id, vec_id,
           ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY score DESC, vec_id) AS rk
    FROM pre_scored) t WHERE rk <= {{k}}
)
SELECT f.query_id,
       CAST(COUNT(p.vec_id) AS BIGINT) AS n_overlap,
       ROUND(CAST(COUNT(p.vec_id) AS DOUBLE) / {{k}}, 6) AS recall_at_k
FROM full_top f LEFT JOIN pre_top p
  ON p.query_id = f.query_id AND p.vec_id = f.vec_id
GROUP BY f.query_id
""".format(vecs=_ORACLE_VECS, mod=QUERY_MOD, k=TOP_K),
)
def matryoshka_prefix_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Matryoshka-representation retrieval audit: top-{TOP_K} by cosine
    over only the FIRST {MRL_DIM} embedding dimensions (the MRL coarse
    pass — {MRL_DIM}/{{d}} of the dot-product FLOPs and bytes) versus the
    full-dimension exact top-{TOP_K}, reported as per-query recall.  This
    is the measurement that decides whether prefix-dim pre-ranking can
    front a rerank stage, exactly like ann_recall_audit decides for
    sign-LSH.

    Determinism: both rankings use ROW_NUMBER with (score DESC, vec_id)
    tie-break on 6-rounded scores; recall is one division by the literal
    K.  Prefix norms are recomputed over the slice (a prefix of a
    unit-norm vector is NOT unit-norm — normalizing by the full norm
    would silently deflate scores).

    Plan at 100 TB: same broadcast-query + per-query window shape as
    cosine_topk, twice; the prefix pass moves {MRL_DIM}-element arrays
    only.  The production composition (prefix pass as the filter, full
    pass on survivors) is ivfadc_rerank_topk's refine shape."""
    vecs = materialize(_vectors(spark, sf_dir))
    q = vecs.filter(F.col("vec_id") % QUERY_MOD == 0).select(
        F.col("vec_id").alias("query_id"),
        F.col("emb").alias("q_emb"),
        F.col("norm").alias("q_norm"),
    )
    pairs = vecs.join(F.broadcast(q), F.col("vec_id") != F.col("query_id"))
    w = Window.partitionBy("query_id").orderBy(F.col("score").desc(), "vec_id")

    full_scored = pairs.select(
        "query_id",
        "vec_id",
        F.round(
            _dot(F.col("q_emb"), F.col("emb")) / (F.col("q_norm") * F.col("norm")), 6
        ).alias("score"),
    )
    full_top = (
        full_scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= TOP_K)
        .select("query_id", "vec_id")
    )
    p_q = F.slice(F.col("q_emb"), 1, MRL_DIM)
    p_v = F.slice(F.col("emb"), 1, MRL_DIM)
    pre_scored = pairs.select(
        "query_id",
        "vec_id",
        F.round(_dot(p_q, p_v) / (_norm(p_q) * _norm(p_v)), 6).alias("score"),
    )
    pre_top = (
        pre_scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= TOP_K)
        .select("query_id", F.col("vec_id").alias("p_vec_id"))
    )
    return (
        full_top.join(
            pre_top,
            (full_top.query_id == pre_top.query_id)
            & (full_top.vec_id == pre_top.p_vec_id),
            "left",
        )
        .groupBy(full_top.query_id)
        .agg(
            F.count("p_vec_id").cast("bigint").alias("n_overlap"),
            F.round(F.count("p_vec_id").cast("double") / TOP_K, 6).alias(
                "recall_at_k"
            ),
        )
    )


# ---------------------------------------------------------------------------
# Scalar int8 quantization audit (embedding storage compression)
# ---------------------------------------------------------------------------
INT8_MAX = 127


@register(
    "int8_quant_audit",
    oracle=f"""
WITH vecs AS ({{vecs}}),
flat AS (
  SELECT vec_id, emb[i] AS x, i AS pos
  FROM (SELECT vec_id, emb, unnest(range(1, len(emb) + 1)) AS i FROM vecs) t
),
scales AS (
  SELECT pos, MAX(ABS(x)) / {INT8_MAX} AS s FROM flat GROUP BY pos
),
quant AS (
  SELECT f.vec_id, f.pos, f.x,
         CASE WHEN s.s = 0 THEN 0
              ELSE GREATEST(-{INT8_MAX}, LEAST({INT8_MAX}, ROUND(f.x / s.s, 0)))
         END AS q,
         s.s
  FROM flat f JOIN scales s ON s.pos = f.pos
),
per_vec AS (
  SELECT vec_id,
         ROUND(SUM(x * q * s)
               / (sqrt(SUM(x * x)) * sqrt(SUM(q * s * q * s))), 6) AS cos_sim,
         ROUND(SUM((x - q * s) * (x - q * s)) / COUNT(*), 6) AS mse,
         SUM(CASE WHEN ABS(q) = {INT8_MAX} THEN 1 ELSE 0 END) AS n_sat
  FROM quant GROUP BY vec_id
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_vectors,
       ROUND(CAST(SUM(CAST(cos_sim AS DECIMAL(18,6))) / COUNT(*) AS DOUBLE), 6)
         AS mean_cos_sim,
       ROUND(MIN(cos_sim), 6) AS worst_cos_sim,
       ROUND(CAST(SUM(CAST(mse AS DECIMAL(18,6))) / COUNT(*) AS DOUBLE), 6)
         AS mean_mse,
       CAST(SUM(n_sat) AS BIGINT) AS n_saturated_components
FROM per_vec
""".format(vecs=_ORACLE_VECS),
)
def int8_quant_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar int8 quantization audit — the storage-compression decision
    for an embedding lake (4x smaller than fp32, 8x than fp64): per-dim
    symmetric scales s_j = max|x_j|/{INT8_MAX}, q = clamp(round(x/s)),
    then the numbers that decide shippability — mean/worst cosine
    similarity between original and dequantized vectors, mean MSE, and
    how many components saturate at ±{INT8_MAX}.  The codebook-based
    alternative is the PQ family (operators/pq.py); scalar quant is the
    zero-training baseline every deployment evaluates first.

    Determinism: scales are exact (max over column / literal); q is
    ROUND-half-away (same rule both engines) on identical doubles; per-
    vector stats round to 6 BEFORE the DECIMAL mean (the dsum
    discipline), so the final row is bit-stable under any partitioning.

    Plan at 100 TB: one posexplode → per-dim max (D-row rollup, map-side
    combined) broadcast back; quantization + per-vector folds are pure
    map-side codegen; the audit row is one aggregate.  Nothing is
    pairwise."""
    vecs = _vectors(spark, sf_dir)
    flat = vecs.select(
        "vec_id", F.posexplode("emb").alias("pos", "x")
    )
    scales = flat.groupBy("pos").agg(
        (F.max(F.abs("x")) / INT8_MAX).alias("s")
    )
    q = F.when(F.col("s") == 0, F.lit(0.0)).otherwise(
        F.greatest(
            F.lit(float(-INT8_MAX)),
            F.least(F.lit(float(INT8_MAX)), F.round(F.col("x") / F.col("s"), 0)),
        )
    )
    quant = flat.join(F.broadcast(scales), "pos").select(
        "vec_id", "x", "s", q.alias("q")
    )
    dq = F.col("q") * F.col("s")
    per_vec = quant.groupBy("vec_id").agg(
        F.round(
            F.sum(F.col("x") * dq)
            / (F.sqrt(F.sum(F.col("x") * F.col("x"))) * F.sqrt(F.sum(dq * dq))),
            6,
        ).alias("cos_sim"),
        F.round(
            F.sum((F.col("x") - dq) * (F.col("x") - dq)) / F.count(F.lit(1)), 6
        ).alias("mse"),
        F.sum(F.when(F.abs("q") == INT8_MAX, 1).otherwise(0)).alias("n_sat"),
    )
    return per_vec.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_vectors"),
        F.round(
            (F.sum(F.col("cos_sim").cast("decimal(18,6)")) / F.count(F.lit(1)))
            .cast("double"),
            6,
        ).alias("mean_cos_sim"),
        F.round(F.min("cos_sim"), 6).alias("worst_cos_sim"),
        F.round(
            (F.sum(F.col("mse").cast("decimal(18,6)")) / F.count(F.lit(1)))
            .cast("double"),
            6,
        ).alias("mean_mse"),
        F.sum("n_sat").cast("bigint").alias("n_saturated_components"),
    )


# ---------------------------------------------------------------------------
# Late-interaction rerank (ColBERT MaxSim shape): coarse cosine -> MaxSim
# ---------------------------------------------------------------------------
SUBVECS = 4  # sub-vectors per embedding (64 dims -> 4 x 16)
SUB_DIM = 16
RERANK_POOL = 20  # coarse top-N per query that pays the MaxSim stage
# Fixed retrieval workload (round 11, same rationale as pq.QUERY_CAP): a
# rerank benchmark holds the query set fixed while the corpus grows.  All
# driver-fixture vec_ids are < 2000, so registered results are unchanged;
# the synthetic 100x tier stops multiplying queries by corpus size.
MAXSIM_QUERY_CAP = 2000


@register(
    "maxsim_late_interaction",
    oracle=f"""
WITH vecs AS ({_ORACLE_VECS}),
q AS (SELECT vec_id AS query_id, emb AS q_emb, norm AS q_norm
      FROM vecs WHERE vec_id % {QUERY_MOD} = 0 AND vec_id < {MAXSIM_QUERY_CAP}),
flat AS (
  SELECT q.query_id, v.vec_id, q.q_norm, v.norm,
         unnest(q.q_emb) AS qx, unnest(v.emb) AS vx
  FROM q JOIN vecs v ON v.vec_id <> q.query_id
),
coarse AS (
  SELECT query_id, vec_id,
         ROUND(SUM(qx * vx) / (ANY_VALUE(q_norm) * ANY_VALUE(norm)), 6) AS coarse_score
  FROM flat GROUP BY query_id, vec_id
),
pool AS (
  SELECT query_id, vec_id, coarse_score FROM (
    SELECT query_id, vec_id, coarse_score,
           ROW_NUMBER() OVER (PARTITION BY query_id
                              ORDER BY coarse_score DESC, vec_id) AS rn
    FROM coarse
  ) WHERE rn <= {RERANK_POOL}
),
subvecs AS (
  SELECT vec_id, g.i AS sub_id,
         list_slice(emb, g.i * {SUB_DIM} + 1, (g.i + 1) * {SUB_DIM}) AS semb,
         sqrt(list_sum(list_transform(
           list_slice(emb, g.i * {SUB_DIM} + 1, (g.i + 1) * {SUB_DIM}),
           x -> x * x))) AS snorm
  FROM vecs CROSS JOIN (SELECT unnest(range(0, {SUBVECS})) AS i) g
),
subflat AS (
  SELECT p.query_id, p.vec_id, qs.sub_id AS q_sub, ds.sub_id AS d_sub,
         qs.snorm AS q_snorm, ds.snorm AS d_snorm,
         unnest(qs.semb) AS qx, unnest(ds.semb) AS vx
  FROM pool p
  JOIN subvecs qs ON qs.vec_id = p.query_id
  JOIN subvecs ds ON ds.vec_id = p.vec_id
),
subcos AS (
  SELECT query_id, vec_id, q_sub, d_sub,
         CASE WHEN ANY_VALUE(q_snorm) * ANY_VALUE(d_snorm) = 0 THEN 0.0
              ELSE ROUND(SUM(qx * vx) / (ANY_VALUE(q_snorm) * ANY_VALUE(d_snorm)), 12)
         END AS c
  FROM subflat GROUP BY query_id, vec_id, q_sub, d_sub
),
best AS (
  SELECT query_id, vec_id, q_sub, MAX(c) AS best_c
  FROM subcos GROUP BY query_id, vec_id, q_sub
),
maxsim AS (
  SELECT query_id, vec_id,
         ROUND(CAST(SUM(CAST(best_c AS DECIMAL(28,12))) AS DOUBLE)
               / {SUBVECS}, 6) AS maxsim_score
  FROM best GROUP BY query_id, vec_id
)
SELECT p.query_id, p.vec_id, p.coarse_score, m.maxsim_score,
       CAST(ROW_NUMBER() OVER (PARTITION BY p.query_id
                               ORDER BY m.maxsim_score DESC, p.vec_id) AS INT)
         AS rank
FROM pool p JOIN maxsim m
  ON m.query_id = p.query_id AND m.vec_id = p.vec_id
QUALIFY rank <= {TOP_K}
ORDER BY p.query_id, rank
""",
)
def maxsim_late_interaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Late-interaction rerank (the ColBERT MaxSim shape on stored
    embeddings): stage 1 scores the pool with whole-vector cosine and
    keeps the top {RERANK_POOL} per query; stage 2 re-scores ONLY that
    pool with MaxSim over {SUBVECS}×{SUB_DIM}-dim sub-vectors — for each
    query sub-vector take its best-matching doc sub-vector's cosine,
    average the {SUBVECS} maxima — and re-ranks to the final top
    {TOP_K}.  This two-stage coarse→late-interaction funnel is the
    standard retrieval deployment: the expensive fine-grained
    interaction touches Q·{RERANK_POOL} pairs, never Q·N.

    Sub-vector scoring is fully relational in BOTH engines: sub-vectors
    are exploded to (vec_id, sub_id) rows, the {SUBVECS}² cross of a
    pair's sub-vectors comes from two equi-joins against the pool, and
    max/avg are plain aggregates — no UDF, no new primitives.

    Determinism: each sub-cosine is a fold + one division (zero-norm
    guarded to 0) ROUNDED to 12 dp, the per-query-sub max is exact over
    those rounded terms, and the {SUBVECS}-term average accumulates in
    DECIMAL — Spark's partition-dependent partial-sum order cannot flip
    a 6th decimal (ADVICE r10); final ties break on vec_id.

    Plan at 100 TB: stage 1 is the documented cosine_topk plan (or any
    registered ANN op — the pool contract is the same); stage 2 joins
    sub-vector rows on vec_id (broadcastable query side), so its cost is
    pool-sized × {SUBVECS}², independent of corpus size."""
    vecs = materialize(_vectors(spark, sf_dir))
    q = vecs.filter(
        ((F.col("vec_id") % QUERY_MOD) == 0)
        & (F.col("vec_id") < MAXSIM_QUERY_CAP)
    ).select(
        F.col("vec_id").alias("query_id"),
        F.col("emb").alias("q_emb"),
        F.col("norm").alias("q_norm"),
    )
    coarse = (
        F.broadcast(q)
        .join(vecs, F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            "vec_id",
            F.round(
                _dot(F.col("q_emb"), F.col("emb"))
                / (F.col("q_norm") * F.col("norm")),
                6,
            ).alias("coarse_score"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("coarse_score").desc(), "vec_id"
    )
    pool = materialize(
        coarse.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= RERANK_POOL)
        .drop("rn")
    )
    sub_stack = ", ".join(
        f"{i}, slice(emb, {i * SUB_DIM + 1}, {SUB_DIM})" for i in range(SUBVECS)
    )
    subvecs = vecs.selectExpr(
        "vec_id", f"stack({SUBVECS}, {sub_stack}) AS (sub_id, semb)"
    ).select(
        "vec_id", "sub_id", "semb", _norm(F.col("semb")).alias("snorm")
    )
    qs = subvecs.select(
        F.col("vec_id").alias("query_id"),
        F.col("sub_id").alias("q_sub"),
        F.col("semb").alias("q_semb"),
        F.col("snorm").alias("q_snorm"),
    )
    ds = subvecs.select(
        F.col("vec_id").alias("vec_id"),
        F.col("sub_id").alias("d_sub"),
        F.col("semb").alias("d_semb"),
        F.col("snorm").alias("d_snorm"),
    )
    subcos = (
        pool.join(F.broadcast(qs), "query_id")
        .join(ds, "vec_id")
        .select(
            "query_id",
            "vec_id",
            "coarse_score",
            "q_sub",
            "d_sub",
            F.when(F.col("q_snorm") * F.col("d_snorm") == 0, F.lit(0.0))
            .otherwise(
                F.round(
                    _dot(F.col("q_semb"), F.col("d_semb"))
                    / (F.col("q_snorm") * F.col("d_snorm")),
                    12,
                )
            )
            .alias("c"),
        )
    )
    best = subcos.groupBy("query_id", "vec_id", "coarse_score", "q_sub").agg(
        F.max("c").alias("best_c")
    )
    maxsim = best.groupBy("query_id", "vec_id", "coarse_score").agg(
        F.round(
            F.sum(F.col("best_c").cast("decimal(28,12)")).cast("double")
            / SUBVECS,
            6,
        ).alias("maxsim_score")
    )
    w2 = Window.partitionBy("query_id").orderBy(
        F.col("maxsim_score").desc(), "vec_id"
    )
    return (
        maxsim.withColumn("rank", F.row_number().over(w2).cast("int"))
        .filter(F.col("rank") <= TOP_K)
        .select("query_id", "vec_id", "coarse_score", "maxsim_score", "rank")
        .orderBy("query_id", "rank")
    )
