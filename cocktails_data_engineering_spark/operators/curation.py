"""Corpus curation operators: semantic dedup, domain mixing, quality
percentile filtering.

The reference stops at collecting documents (web_spider_oo.py:354-358
writes raw page text); a training-data pipeline then has to CURATE the
collected corpus.  Three curation stages, each expressed Spark-first and
each with a full DuckDB value oracle:

- **semantic_dedup_clusters** — SemDeDup (Abbas et al., 2023): cluster
  the embedding space with k-means, then search for near-duplicate
  pairs ONLY within a cluster.  This is the third candidate-pruning
  family in the dedup suite: MinHash-LSH prunes by shingle-band
  collision (operators/dedup.py), sign-LSH prunes by random-hyperplane
  bucket (operators/similarity.py), SemDeDup prunes by LEARNED
  partition — the same idea as IVF, applied to dedup.
- **domain_mixture_sample** — deterministic hash-based downsampling to
  hit a target domain mixture (the DoReMi / data-mixing shape): compute
  per-domain rates from the target weights, keep a row iff a stable
  per-row hash falls under the domain's rate.  No randomness — both
  engines agree row-for-row.
- **quality_percentile_filter** — keep the top half of each source by a
  quality score via PERCENT_RANK: the "filter to the best X% per
  domain" stage (C4/Gopher-style), rank-based so it is scale-free.

Scale notes (100 TB):
- SemDeDup's pair search is quadratic ONLY within a cluster; k grows
  with corpus size (k ≈ N / target_cluster_size) so per-cluster cost is
  bounded — the fixture uses the engine's deterministic K=4 codebook
  (operators/clustering.py) to stay oracle-exact.  The pair join is an
  equi-join on cluster id (shuffle-partitioned by cluster), never a
  cross join; `tests/test_plan_contracts.py` asserts no
  BroadcastNestedLoopJoin.
- Mixture sampling is one count() aggregation over domains (tiny), a
  broadcast of the per-domain rates, and a map-side hash filter — the
  scan never shuffles.
- The percentile filter shuffles once on the partition key (source) and
  ranks within partitions — the standard windowed-topk shape; skewed
  sources would use the salted-window variant (extensions.salted_topk).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..checkpointing import materialize
from ..functions.numerics import dsum, oracle_dsum
from ..registry import register
from ..sources.tables import load
from .clustering import (
    BATCH_MOD,
    K as _K,
    _ORACLE_VECS,
    _assign,
    _init_centroids,
    _oracle_cent,
    _oracle_round,
    _update,
    _vectors,
)
from .similarity import _dot, _norm

SEM_TAU = 0.4  # same near-dup cosine threshold as similarity.NEAR_DUP_COS

# SemDeDup's cluster count must GROW with the corpus (Abbas et al. use
# 50k clusters at LAION scale): with fixed K, within-cluster pair cost is
# quadratic in N (measured 18.6x wall for 10x data in the r6 scale
# stress).  K = max(K_base, ceil(N / SEM_TARGET_CLUSTER)) keeps expected
# cluster size — and therefore pair cost per row — constant, so total
# pair work scales linearly.  At driver scales (N <= {K*500}) this is
# exactly the old K={K}, so registered results are unchanged.
SEM_TARGET_CLUSTER = 500


def _sem_k(n: int) -> int:
    import math

    return max(_K, math.ceil(n / SEM_TARGET_CLUSTER))


def _init_centroids_dyn(vecs: DataFrame, k_dyn: int) -> DataFrame:
    """The k_dyn vectors whose md5(vec_id) sort first, as (cid, cemb) —
    clustering._init_centroids with a data-scaled K."""
    seeds = (
        vecs.select("vec_id", F.md5(F.col("vec_id").cast("string")).alias("h"))
        .orderBy("h", "vec_id")
        .limit(k_dyn)
        .select("vec_id")
    )
    return vecs.join(F.broadcast(seeds), "vec_id").select(
        F.col("vec_id").alias("cid"), F.col("emb").alias("cemb")
    )


# K-independent oracle twin: seeds via window rank <= GREATEST(K, ceil(n/target))
_ORACLE_VECS_DYN = f"""
vecs AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb
  FROM embeddings
),
init AS (
  SELECT vec_id AS cid, emb AS cemb
  FROM (SELECT vec_id, emb,
               ROW_NUMBER() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) AS rk,
               COUNT(*) OVER () AS n
        FROM vecs)
  WHERE rk <= GREATEST({_K}, CEIL(n / {SEM_TARGET_CLUSTER}.0))
)"""


def within_cluster_dups(sides: DataFrame, tau: float) -> DataFrame:
    """Distinct (cid, ib) duplicate ids: vectors with a same-cluster
    neighbor of cosine ≥ tau and smaller vec_id.  ``sides`` columns:
    (cid, vec_id, emb, nrm).  The join is an equi-join on cid — the
    SemDeDup pruning contract (never all-pairs)."""
    a = sides.select(
        "cid", F.col("vec_id").alias("ia"), F.col("emb").alias("ea"), F.col("nrm").alias("na")
    )
    b = sides.select(
        "cid", F.col("vec_id").alias("ib"), F.col("emb").alias("eb"), F.col("nrm").alias("nb")
    )
    cosine = F.round(_dot(F.col("ea"), F.col("eb")) / (F.col("na") * F.col("nb")), 6)
    return (
        a.join(b, "cid")
        .filter(F.col("ia") < F.col("ib"))
        .select("cid", "ib", cosine.alias("cosine"))
        .filter(F.col("cosine") >= tau)
        .select("cid", "ib")
        .distinct()
    )


@register(
    "semantic_dedup_clusters",
    oracle=f"""
WITH {_ORACLE_VECS_DYN.strip()},
{_oracle_round('init', 'r0').strip()},
{_oracle_cent('r0_a', 'cent1').strip()},
{_oracle_round('cent1', 'r1').strip()},
norms AS (
  SELECT vec_id, SQRT(SUM(x * x)) AS nrm
  FROM (SELECT vec_id, unnest(emb) AS x FROM vecs) GROUP BY vec_id
),
pairs AS (
  SELECT a.cid, a.vec_id AS ia, b.vec_id AS ib
  FROM r1_a a JOIN r1_a b ON a.cid = b.cid AND a.vec_id < b.vec_id
),
flat AS (
  SELECT p.cid, p.ia, p.ib, unnest(va.emb) AS xa, unnest(vb.emb) AS xb
  FROM pairs p
  JOIN vecs va ON va.vec_id = p.ia
  JOIN vecs vb ON vb.vec_id = p.ib
),
dots AS (SELECT cid, ia, ib, SUM(xa * xb) AS dot FROM flat GROUP BY cid, ia, ib),
scored AS (
  SELECT d.cid, d.ib, ROUND(d.dot / (na.nrm * nb.nrm), 6) AS cosine
  FROM dots d
  JOIN norms na ON na.vec_id = d.ia
  JOIN norms nb ON nb.vec_id = d.ib
),
dups AS (SELECT DISTINCT cid, ib FROM scored WHERE cosine >= {SEM_TAU}),
dcnt AS (SELECT cid, COUNT(*) AS nd FROM dups GROUP BY cid),
mem AS (SELECT cid, COUNT(*) AS n_members FROM r1_a GROUP BY cid)
SELECT m.cid AS cluster_id, m.n_members,
       CAST(COALESCE(dc.nd, 0) AS BIGINT) AS n_dups,
       m.n_members - CAST(COALESCE(dc.nd, 0) AS BIGINT) AS n_kept
FROM mem m LEFT JOIN dcnt dc USING (cid)
""",
)
def semantic_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup: one oracle-exact Lloyd round partitions the embedding
    space (clustering.kmeans_assign_embeddings's exact pipeline), then
    near-duplicate pairs (cosine ≥ {SEM_TAU}) are searched ONLY within a
    cluster; the higher vec_id of each pair is the duplicate.  Returns
    per-cluster member/dup/kept counts.

    Plan: centroids broadcast; the pair join is an equi-join on the
    cluster id (cost Σ cluster², bounded because k scales with N at real
    corpus sizes); cosine is a Catalyst zip_with/aggregate fold, rounded
    to 6 decimals so the DuckDB twin is engine-exact."""
    vecs = _vectors(spark, sf_dir)
    # one O(1) driver scalar (the kmeans-inertia pattern) sizes K to the
    # corpus so expected cluster size stays ~SEM_TARGET_CLUSTER
    k_dyn = _sem_k(vecs.count())
    cents1 = _update(_assign(vecs, _init_centroids_dyn(vecs, k_dyn)))
    # materialize: the assignment feeds BOTH sides of the pair join plus
    # the membership count — without it the Lloyd chain runs 3×
    assign = materialize(_assign(vecs, cents1).select("vec_id", "cid", "emb"))
    sides = assign.withColumn("nrm", _norm(F.col("emb")))
    dups = within_cluster_dups(sides, SEM_TAU)
    mem = assign.groupBy("cid").agg(F.count(F.lit(1)).alias("n_members"))
    dcnt = dups.groupBy("cid").agg(F.count(F.lit(1)).alias("nd"))
    return (
        mem.join(dcnt, "cid", "left")
        .select(
            F.col("cid").alias("cluster_id"),
            "n_members",
            F.coalesce("nd", F.lit(0)).cast("long").alias("n_dups"),
            (F.col("n_members") - F.coalesce("nd", F.lit(0))).cast("long").alias("n_kept"),
        )
    )


# ---------------------------------------------------------------------------
# Domain mixture sampling

# Target language mixture for the corpus (weights sum to 1).  T =
# floor(min_lang(n_lang / w_lang)) is the largest total corpus size every
# domain can serve at its target share; rate_lang = w*T/n keeps exactly
# the target proportions in expectation.
MIX_WEIGHTS = {"en": 0.30, "de": 0.20, "es": 0.20, "fr": 0.15, "zh": 0.15}
_HEX = "0123456789abcdef"
_MIX_HEX_CHARS = 6  # 24-bit hash: plenty of rate resolution, engine-portable
_MIX_SPACE = 16 ** _MIX_HEX_CHARS


def _hash24(col) -> F.Column:
    """First 6 hex chars of md5('mix|' || doc_id) as a 24-bit integer via
    alphabet indexing (instr) — identical in any engine with md5+strpos
    (same trick as dedup._simhash_hex / similarity's band hash)."""
    h = F.md5(F.concat(F.lit("mix|"), col.cast("string")))
    v = F.lit(0).cast("bigint")
    for i in range(_MIX_HEX_CHARS):
        v = v + (F.instr(F.lit(_HEX), F.substring(h, i + 1, 1)) - 1).cast("bigint") * (
            16 ** (_MIX_HEX_CHARS - 1 - i)
        )
    return v


_ORACLE_HASH24 = "(" + " + ".join(
    f"(strpos('{_HEX}', substr(md5('mix|' || CAST(doc_id AS VARCHAR)), {i + 1}, 1)) - 1)"
    f" * {16 ** (_MIX_HEX_CHARS - 1 - i)}"
    for i in range(_MIX_HEX_CHARS)
) + ")"

_ORACLE_WEIGHTS = " UNION ALL ".join(
    f"SELECT '{k}' AS lang, CAST({w} AS DOUBLE) AS w" for k, w in MIX_WEIGHTS.items()
)

# Shared CTE chain: per-language sampling rates from the target weights
# (used by domain_mixture_sample AND the composed curation_pipeline).
_ORACLE_RATES_CTES = f"""weights AS ({_ORACLE_WEIGHTS}),
counts AS (SELECT lang, COUNT(*) AS n_docs FROM documents GROUP BY lang),
t AS (SELECT FLOOR(MIN(n_docs / w)) AS t FROM counts JOIN weights USING (lang)),
rates AS (
  SELECT c.lang, c.n_docs, w.w,
         LEAST(1.0, (w.w * t.t) / c.n_docs) AS rate
  FROM counts c JOIN weights w USING (lang) CROSS JOIN t
)"""


def mixture_rates(spark: SparkSession, docs: DataFrame) -> DataFrame:
    """Per-language sampling rates (lang, n_docs, w, rate) toward the
    MIX_WEIGHTS target: T = floor(min(n/w)) is the largest corpus every
    domain can serve at its share, rate = min(1, w·T/n)."""
    wdf = spark.createDataFrame(
        [(k, float(v)) for k, v in MIX_WEIGHTS.items()], "lang string, w double"
    )
    # inner join ⇒ a language absent from MIX_WEIGHTS gets rate 0 (dropped
    # from the mixture entirely) — the oracle applies the same rule
    counts = docs.groupBy("lang").agg(F.count(F.lit(1)).alias("n_docs"))
    cw = counts.join(F.broadcast(wdf), "lang")
    t = cw.agg(F.floor(F.min(F.col("n_docs") / F.col("w"))).alias("t"))
    return cw.crossJoin(F.broadcast(t)).select(
        "lang",
        "n_docs",
        "w",
        F.least(F.lit(1.0), (F.col("w") * F.col("t")) / F.col("n_docs")).alias("rate"),
    )


def mixture_keep_filter(docs: DataFrame, rates: DataFrame) -> DataFrame:
    """Rows of ``docs`` surviving the deterministic mixture sample: rates
    broadcast onto the scan, md5-threshold keep decision map-side."""
    thr = F.floor(F.col("rate") * F.lit(float(_MIX_SPACE))).cast("bigint")
    return (
        docs.join(F.broadcast(rates.select("lang", "rate")), "lang")
        .filter(_hash24(F.col("doc_id")) < thr)
        .drop("rate")
    )


@register(
    "domain_mixture_sample",
    oracle=f"""
WITH {_ORACLE_RATES_CTES},
kept AS (
  SELECT d.lang, COUNT(*) AS n_kept
  FROM documents d JOIN rates r USING (lang)
  WHERE {_ORACLE_HASH24} < CAST(FLOOR(r.rate * {_MIX_SPACE}.0) AS BIGINT)
  GROUP BY d.lang
)
SELECT r.lang, r.n_docs, CAST(COALESCE(k.n_kept, 0) AS BIGINT) AS n_kept,
       r.w AS target_w, ROUND(r.rate, 6) AS sample_rate
FROM rates r LEFT JOIN kept k USING (lang)
""",
)
def domain_mixture_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic domain-mixture downsampling (the data-mixing stage):
    per-language keep rates derived from MIX_WEIGHTS, applied as a
    stable md5-hash threshold so the sample is reproducible on any
    engine and any partitioning (no rand()).

    Plan: one tiny groupBy(lang) count, rates broadcast back onto the
    scan, the keep decision entirely map-side — at 100 TB the only
    shuffle is the per-domain count."""
    docs = load(spark, sf_dir, "documents")
    rates = mixture_rates(spark, docs)
    kept = (
        mixture_keep_filter(docs, rates)
        .groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n_kept"))
    )
    return rates.join(kept, "lang", "left").select(
        "lang",
        "n_docs",
        F.coalesce("n_kept", F.lit(0)).cast("long").alias("n_kept"),
        F.col("w").alias("target_w"),
        F.round("rate", 6).alias("sample_rate"),
    )


# ---------------------------------------------------------------------------
# Quality percentile filter

# Pure-arithmetic quality score (no transcendental functions — libm vs
# java.lang.Math could differ in the last ulp): stopword density scaled
# up + average token length, rounded to 6 so both engines rank the same.
_SQL_QSCORE = """ROUND(
  CAST(n_stopwords AS DOUBLE) * 100.0 / n_tokens
  + CAST(n_chars_actual AS DOUBLE) / n_tokens, 6)"""


@register(
    "quality_percentile_filter",
    oracle=f"""
WITH feats AS (
  SELECT doc_id, source,
         length(text) AS n_chars_actual,
         len(list_filter(string_split(text, ' '), w -> w <> '')) AS n_tokens,
         len(list_filter(string_split(text, ' '),
                         w -> w IN ('the','a','of','and','to','in','is'))) AS n_stopwords
  FROM documents
),
scored AS (SELECT doc_id, source, {_SQL_QSCORE} AS qscore FROM feats),
ranked AS (
  SELECT source, qscore,
         PERCENT_RANK() OVER (PARTITION BY source ORDER BY qscore DESC, doc_id) AS pr
  FROM scored
)
SELECT source,
       COUNT(*) AS n_docs,
       CAST(SUM(CASE WHEN pr <= 0.5 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
       MIN(CASE WHEN pr <= 0.5 THEN qscore END) AS min_kept_score,
       ROUND({oracle_dsum('CASE WHEN pr <= 0.5 THEN qscore END')}
             / SUM(CASE WHEN pr <= 0.5 THEN 1 ELSE 0 END), 6) AS avg_kept_score
FROM ranked GROUP BY source
""",
)
def quality_percentile_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keep the top half of each source by quality score (rank-based, so
    the cut adapts per source — the "best X% per domain" filter).  The
    score reuses text_analysis.quality_score's features; PERCENT_RANK
    with a doc_id tiebreak makes the cut deterministic.

    Plan: one shuffle on source + in-partition sort (windowed-rank
    shape); the aggregation rides the same partitioning, so no second
    exchange of the big table."""
    from .text_analysis import quality_features

    docs = load(spark, sf_dir, "documents")
    feats = quality_features(docs).select(
        "doc_id", "source", "n_chars_actual", "n_tokens", "n_stopwords"
    )
    qscore = F.round(
        F.col("n_stopwords").cast("double") * 100.0 / F.col("n_tokens")
        + F.col("n_chars_actual").cast("double") / F.col("n_tokens"),
        6,
    )
    w = Window.partitionBy("source").orderBy(F.col("qscore").desc(), "doc_id")
    ranked = feats.select("doc_id", "source", qscore.alias("qscore")).withColumn(
        "pr", F.percent_rank().over(w)
    )
    keep = F.when(F.col("pr") <= 0.5, F.lit(1)).otherwise(F.lit(0))
    kept_score = F.when(F.col("pr") <= 0.5, F.col("qscore"))
    return ranked.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(keep).cast("long").alias("n_kept"),
        F.min(kept_score).alias("min_kept_score"),
        F.round(dsum(kept_score) / F.sum(keep), 6).alias("avg_kept_score"),
    )


# ---------------------------------------------------------------------------
# Training-prep: label prototypes (nearest-class-mean) + hard negatives

from .clustering import DIM as _EMB_DIM  # noqa: E402
from .similarity import _ORACLE_VECS as _SIM_ORACLE_VECS  # noqa: E402
from .similarity import QUERY_MOD, _vectors as _sim_vectors  # noqa: E402

N_HARD_NEG = 3


@register(
    "label_prototype_confusion",
    oracle=f"""
WITH vecs AS ({_SIM_ORACLE_VECS.strip()}),
proto_dim AS (
  SELECT label, i,
         ROUND(CAST(SUM(CAST(emb[i] AS DECIMAL(18,12))) AS DOUBLE) / COUNT(*), 6) AS c
  FROM vecs CROSS JOIN generate_series(1, {_EMB_DIM}) t(i)
  GROUP BY label, i
),
proto AS (SELECT label AS cid, list(c ORDER BY i) AS cemb FROM proto_dim GROUP BY label),
{_oracle_round('proto', 'p').strip()}
SELECT v.label AS true_label, a.cid AS pred_label, COUNT(*) AS n
FROM p_a a JOIN vecs v USING (vec_id)
GROUP BY v.label, a.cid
""",
)
def label_prototype_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest-class-mean classification over embeddings: per-label
    prototype = DECIMAL-exact per-dimension mean (the mean-pooling step
    every embedding pipeline runs), each vector assigned to its nearest
    prototype, reported as a (true_label, pred_label) confusion matrix.
    The supervised counterpart of the k-means codebook — same broadcast
    assignment plan, prototypes learned from labels instead of Lloyd
    rounds.

    Plan: prototype aggregation shuffles (|labels| × dim) decimal
    partials per task (independent of row count); prototypes broadcast;
    assignment is map-side; the confusion aggregate is |labels|² rows."""
    vecs = _sim_vectors(spark, sf_dir)
    protos = _update(vecs.select(F.col("label").alias("cid"), "emb"))
    assigned = _assign(vecs.select("vec_id", "emb"), protos)
    return (
        assigned.join(vecs.select("vec_id", "label"), "vec_id")
        .groupBy(F.col("label").alias("true_label"), F.col("cid").alias("pred_label"))
        .agg(F.count(F.lit(1)).alias("n"))
    )


@register(
    "hard_negative_mining",
    oracle=f"""
WITH vecs AS ({_SIM_ORACLE_VECS.strip()}),
q AS (SELECT vec_id AS query_id, label AS q_label, emb AS q_emb, norm AS q_norm
      FROM vecs WHERE vec_id % {QUERY_MOD} = 0),
flat AS (
  SELECT q.query_id, v.vec_id, q.q_norm, v.norm,
         unnest(q.q_emb) AS qx, unnest(v.emb) AS vx
  FROM q JOIN vecs v ON v.vec_id <> q.query_id AND v.label <> q.q_label
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
SELECT query_id, vec_id, score, rank FROM ranked WHERE rank <= {N_HARD_NEG}
""",
)
def hard_negative_mining(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hard-negative mining for contrastive training: for each anchor
    (the query subset), the {N_HARD_NEG} highest-cosine vectors with a
    DIFFERENT label — the negatives that actually teach the model.
    Same broadcast-anchor + windowed-topk plan as cosine_topk; the label
    inequality rides the join condition so wrong-label filtering happens
    before any scoring.  At scale the exact scan becomes the ANN
    candidate path (sign-LSH / IVF) with the label filter applied to
    candidates."""
    vecs = _sim_vectors(spark, sf_dir)
    q = vecs.filter(F.col("vec_id") % QUERY_MOD == 0).select(
        F.col("vec_id").alias("query_id"),
        F.col("label").alias("q_label"),
        F.col("emb").alias("q_emb"),
        F.col("norm").alias("q_norm"),
    )
    pairs = vecs.join(
        F.broadcast(q),
        (F.col("vec_id") != F.col("query_id")) & (F.col("label") != F.col("q_label")),
    )
    score = F.round(
        _dot(F.col("q_emb"), F.col("emb")) / (F.col("q_norm") * F.col("norm")), 6
    )
    scored = pairs.select("query_id", "vec_id", score.alias("score"))
    w = Window.partitionBy("query_id").orderBy(F.col("score").desc(), "vec_id")
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= N_HARD_NEG)
        .select("query_id", "vec_id", "score", "rank")
    )


# ---------------------------------------------------------------------------
# Composed flagship #4: the full curation funnel

@register(
    "curation_pipeline",
    oracle=f"""
WITH {_ORACLE_RATES_CTES},
sampled AS (
  SELECT d.doc_id, d.lang, d.source, d.text
  FROM documents d JOIN rates r USING (lang)
  WHERE {_ORACLE_HASH24} < CAST(FLOOR(r.rate * {_MIX_SPACE}.0) AS BIGINT)
),
feats AS (
  SELECT doc_id, lang, source, text,
         length(text) AS n_chars_actual,
         len(list_filter(string_split(text, ' '), w -> w <> '')) AS n_tokens,
         len(list_filter(string_split(text, ' '),
                         w -> w IN ('the','a','of','and','to','in','is'))) AS n_stopwords
  FROM sampled
),
ranked AS (
  SELECT doc_id, lang, text,
         PERCENT_RANK() OVER (
           PARTITION BY source
           ORDER BY {_SQL_QSCORE} DESC, doc_id) AS pr
  FROM feats
),
quality AS (SELECT doc_id, lang, text FROM ranked WHERE pr <= 0.5),
fp AS (
  SELECT doc_id, lang,
         md5(lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))) AS fingerprint
  FROM quality
),
final AS (
  SELECT doc_id, lang
  FROM (SELECT doc_id, lang,
               ROW_NUMBER() OVER (PARTITION BY fingerprint ORDER BY doc_id) AS rk
        FROM fp) t
  WHERE rk = 1
),
c0 AS (SELECT lang, COUNT(*) AS n_docs FROM documents GROUP BY lang),
c1 AS (SELECT lang, COUNT(*) AS n_sampled FROM sampled GROUP BY lang),
c2 AS (SELECT lang, COUNT(*) AS n_quality FROM quality GROUP BY lang),
c3 AS (SELECT lang, COUNT(*) AS n_final FROM final GROUP BY lang)
SELECT c0.lang, c0.n_docs,
       CAST(COALESCE(c1.n_sampled, 0) AS BIGINT) AS n_sampled,
       CAST(COALESCE(c2.n_quality, 0) AS BIGINT) AS n_quality,
       CAST(COALESCE(c3.n_final, 0) AS BIGINT) AS n_final
FROM c0
LEFT JOIN c1 USING (lang) LEFT JOIN c2 USING (lang) LEFT JOIN c3 USING (lang)
""",
)
def curation_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composed flagship #4 — the curation funnel a training-data team
    runs end-to-end: domain mixture sample → per-source quality
    percentile gate → exact dedup (normalized-text fingerprint, min
    doc_id canonical), reported as per-language counts at every stage.

    Scale shape, stage by stage: the mixture sample is a broadcast-rate
    map-side filter; the quality gate is ONE shuffle on source (window
    rank); the exact dedup is ONE shuffle on the 32-byte fingerprint.
    No stage rescans the corpus — each consumes the previous stage's
    output, and the per-stage counts ride the same aggregations."""
    from .text_analysis import quality_features

    docs = load(spark, sf_dir, "documents")
    rates = mixture_rates(spark, docs)
    sampled = mixture_keep_filter(
        docs.select("doc_id", "lang", "source", "text"), rates
    )

    feats = quality_features(sampled)
    qscore = F.round(
        F.col("n_stopwords").cast("double") * 100.0 / F.col("n_tokens")
        + F.col("n_chars_actual").cast("double") / F.col("n_tokens"),
        6,
    )
    w = Window.partitionBy("source").orderBy(qscore.desc(), "doc_id")
    quality = (
        feats.withColumn("pr", F.percent_rank().over(w))
        .filter(F.col("pr") <= 0.5)
        .select("doc_id", "lang", "text")
    )

    fingerprint = F.md5(F.lower(F.trim(F.regexp_replace("text", r"\s+", " "))))
    wf = Window.partitionBy("fingerprint").orderBy("doc_id")
    final = (
        quality.select("doc_id", "lang", fingerprint.alias("fingerprint"))
        .withColumn("rk", F.row_number().over(wf))
        .filter(F.col("rk") == 1)
        .select("doc_id", "lang")
    )

    c0 = docs.groupBy("lang").agg(F.count(F.lit(1)).alias("n_docs"))
    c1 = sampled.groupBy("lang").agg(F.count(F.lit(1)).alias("n_sampled"))
    c2 = quality.groupBy("lang").agg(F.count(F.lit(1)).alias("n_quality"))
    c3 = final.groupBy("lang").agg(F.count(F.lit(1)).alias("n_final"))
    return (
        c0.join(c1, "lang", "left")
        .join(c2, "lang", "left")
        .join(c3, "lang", "left")
        .select(
            "lang",
            "n_docs",
            F.coalesce("n_sampled", F.lit(0)).cast("long").alias("n_sampled"),
            F.coalesce("n_quality", F.lit(0)).cast("long").alias("n_quality"),
            F.coalesce("n_final", F.lit(0)).cast("long").alias("n_final"),
        )
    )


# ---------------------------------------------------------------------------
# Incremental semantic dedup (the daily-ingest shape for vectors)



@register(
    "incremental_semantic_dedup",
    oracle=f"""
WITH vecs AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb
  FROM embeddings
),
corpus AS (SELECT * FROM vecs WHERE vec_id % {BATCH_MOD} <> 0),
batch AS (SELECT * FROM vecs WHERE vec_id % {BATCH_MOD} = 0),
init AS (
  SELECT vec_id AS cid, emb AS cemb
  FROM (SELECT vec_id, emb,
               ROW_NUMBER() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) AS rk,
               COUNT(*) OVER () AS n
        FROM corpus)
  WHERE rk <= GREATEST({_K}, CEIL(n / {SEM_TARGET_CLUSTER}.0))
),
{_oracle_round('init', 'r0', 'corpus').strip()},
{_oracle_cent('r0_a', 'cent1', 'corpus').strip()},
{_oracle_round('cent1', 'ca', 'corpus').strip()},
{_oracle_round('cent1', 'ba', 'batch').strip()},
norms AS (
  SELECT vec_id, SQRT(SUM(x * x)) AS nrm
  FROM (SELECT vec_id, unnest(emb) AS x FROM vecs) GROUP BY vec_id
),
cand AS (
  SELECT b.vec_id AS bid, a.vec_id AS aid, b.cid
  FROM ba_a b JOIN ca_a a ON a.cid = b.cid
),
flat AS (
  SELECT c.bid, c.aid, unnest(vb.emb) AS xb, unnest(va.emb) AS xa
  FROM cand c
  JOIN vecs vb ON vb.vec_id = c.bid
  JOIN vecs va ON va.vec_id = c.aid
),
dots AS (SELECT bid, aid, SUM(xb * xa) AS dot FROM flat GROUP BY bid, aid),
scored AS (
  SELECT d.bid, ROUND(d.dot / (nb.nrm * na.nrm), 6) AS cosine
  FROM dots d
  JOIN norms nb ON nb.vec_id = d.bid
  JOIN norms na ON na.vec_id = d.aid
),
matches AS (SELECT bid, COUNT(*) AS n_matches FROM scored
            WHERE cosine >= {SEM_TAU} GROUP BY bid)
SELECT b.vec_id, b.cid AS cluster_id,
       CAST(COALESCE(m.n_matches, 0) AS BIGINT) AS n_matches,
       CASE WHEN COALESCE(m.n_matches, 0) > 0 THEN 1 ELSE 0 END AS is_dup
FROM ba_a b LEFT JOIN matches m ON m.bid = b.vec_id
""",
)
def incremental_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental SemDeDup — screen today's embedding batch against the
    existing corpus without re-deduping the corpus: centroids are learned
    from the CORPUS only (one oracle-exact Lloyd round), the batch is
    assigned to those fixed clusters, and each batch vector is compared
    ONLY against corpus members of its own cluster.  The vector-space
    mirror of dedup.incremental_minhash_dedup.

    Plan: centroids broadcast; both assignments map-side; the probe join
    is an equi-join on cluster id whose cost is |batch| × cluster size —
    linear in the batch, never corpus²."""
    vecs = _vectors(spark, sf_dir)
    corpus = vecs.filter(F.col("vec_id") % BATCH_MOD != 0)
    batch = vecs.filter(F.col("vec_id") % BATCH_MOD == 0)

    # cents1 is k×dim and feeds two assignments; ba feeds the probe join
    # AND the final report — materialize both so the corpus Lloyd chain
    # runs once
    # dynamic K from the CORPUS size (r6 scale stress: fixed K=4 made the
    # probe join quadratic — 17x wall for 10x data)
    cents1 = materialize(
        _update(_assign(corpus, _init_centroids_dyn(corpus, _sem_k(corpus.count()))))
    )
    ca = _assign(corpus, cents1).select("vec_id", "cid", "emb")
    ba = materialize(_assign(batch, cents1).select("vec_id", "cid", "emb"))

    a = ca.withColumn("nrm", _norm(F.col("emb"))).select(
        "cid", F.col("vec_id").alias("aid"), F.col("emb").alias("ea"), F.col("nrm").alias("na")
    )
    b = ba.withColumn("nrm", _norm(F.col("emb"))).select(
        "cid", F.col("vec_id").alias("bid"), F.col("emb").alias("eb"), F.col("nrm").alias("nb")
    )
    cosine = F.round(_dot(F.col("eb"), F.col("ea")) / (F.col("nb") * F.col("na")), 6)
    matches = (
        b.join(a, "cid")
        .select("bid", cosine.alias("cosine"))
        .filter(F.col("cosine") >= SEM_TAU)
        .groupBy("bid")
        .agg(F.count(F.lit(1)).alias("n_matches"))
    )
    return (
        ba.join(matches, ba.vec_id == matches.bid, "left")
        .select(
            "vec_id",
            F.col("cid").alias("cluster_id"),
            F.coalesce("n_matches", F.lit(0)).cast("long").alias("n_matches"),
            F.when(F.coalesce("n_matches", F.lit(0)) > 0, F.lit(1))
            .otherwise(F.lit(0))
            .alias("is_dup"),
        )
    )


# ---------------------------------------------------------------------------
# MMR diverse top-k (diverse eval/demo-set selection)

MMR_POOL = 10  # relevance top-N candidate pool per query
MMR_K = 3  # diverse picks per query
MMR_LAMBDA = 0.5


def _mmr_oracle() -> str:
    """Unrolled greedy MMR in SQL: candidate pool = exact cosine
    top-{MMR_POOL} per query; pairwise candidate cosines precomputed
    ONCE; then {MMR_K} argmax steps, each penalizing by the max cosine
    to the already-selected set."""
    pool = f"""
WITH vecs AS ({_SIM_ORACLE_VECS.strip()}),
q AS (SELECT vec_id AS query_id, emb AS q_emb, norm AS q_norm
      FROM vecs WHERE vec_id % {QUERY_MOD} = 0),
qflat AS (
  SELECT q.query_id, v.vec_id, q.q_norm, v.norm,
         unnest(q.q_emb) AS qx, unnest(v.emb) AS vx
  FROM q JOIN vecs v ON v.vec_id <> q.query_id
),
qscored AS (
  SELECT query_id, vec_id,
         ROUND(SUM(qx * vx) / (ANY_VALUE(q_norm) * ANY_VALUE(norm)), 6) AS rel
  FROM qflat GROUP BY query_id, vec_id
),
cands AS (
  SELECT query_id, vec_id, rel
  FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                     ORDER BY rel DESC, vec_id) AS rk
        FROM qscored) t
  WHERE rk <= {MMR_POOL}
),
pcflat AS (
  SELECT a.query_id, a.vec_id AS va, b.vec_id AS vb, x.norm AS nx, y.norm AS ny,
         unnest(x.emb) AS xa, unnest(y.emb) AS xb
  FROM cands a
  JOIN cands b ON b.query_id = a.query_id AND b.vec_id <> a.vec_id
  JOIN vecs x ON x.vec_id = a.vec_id
  JOIN vecs y ON y.vec_id = b.vec_id
),
pc AS (
  SELECT query_id, va, vb,
         ROUND(SUM(xa * xb) / (ANY_VALUE(nx) * ANY_VALUE(ny)), 6) AS c
  FROM pcflat GROUP BY query_id, va, vb
),
s1 AS (
  SELECT query_id, vec_id, rel, 1 AS rank
  FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                     ORDER BY rel DESC, vec_id) AS rk
        FROM cands) t
  WHERE rk = 1
)"""
    steps = []
    prev_sel = "s1"
    for k in range(2, MMR_K + 1):
        sel_union = " UNION ALL ".join(
            f"SELECT query_id, vec_id FROM s{i}" for i in range(1, k)
        )
        steps.append(f""",
sel{k - 1} AS ({sel_union}),
p{k} AS (
  SELECT r.query_id, r.vec_id, r.rel, MAX(pc.c) AS pen
  FROM cands r
  JOIN pc ON pc.query_id = r.query_id AND pc.va = r.vec_id
  JOIN sel{k - 1} s ON s.query_id = pc.query_id AND s.vec_id = pc.vb
  WHERE NOT EXISTS (SELECT 1 FROM sel{k - 1} z
                    WHERE z.query_id = r.query_id AND z.vec_id = r.vec_id)
  GROUP BY r.query_id, r.vec_id, r.rel
),
s{k} AS (
  SELECT query_id, vec_id, rel, {k} AS rank
  FROM (SELECT *, ROW_NUMBER() OVER (
          PARTITION BY query_id
          ORDER BY ROUND({MMR_LAMBDA} * rel - {1 - MMR_LAMBDA} * pen, 6) DESC,
                   vec_id) AS rk
        FROM p{k}) t
  WHERE rk = 1
)""")
        prev_sel = f"s{k}"
    final = " UNION ALL ".join(
        f"SELECT query_id, vec_id, rel AS relevance, rank FROM s{i}"
        for i in range(1, MMR_K + 1)
    )
    return pool + "".join(steps) + f"\n{final}"


@register("mmr_diverse_topk", oracle=_mmr_oracle())
def mmr_diverse_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximal-marginal-relevance diverse top-{MMR_K} per query: greedy
    selection maximizing λ·relevance − (1−λ)·max-similarity-to-selected
    over the exact cosine top-{MMR_POOL} pool — the diverse eval/demo-set
    builder (pure relevance top-k returns near-duplicates; MMR trades
    relevance for coverage).

    Plan: the pool is the cosine-topk shape (queries broadcast, windowed
    rank); pairwise candidate cosines are computed ONCE (≤pool² rows per
    query, an equi-join on query_id) and materialized; each greedy step
    is then a per-query windowed argmax over ≤pool rows — {MMR_K}
    driver-loop steps of metadata-sized relational work, distributed
    ACROSS queries."""
    vecs = _sim_vectors(spark, sf_dir)
    q = vecs.filter(F.col("vec_id") % QUERY_MOD == 0).select(
        F.col("vec_id").alias("query_id"),
        F.col("emb").alias("q_emb"),
        F.col("norm").alias("q_norm"),
    )
    rel = F.round(
        _dot(F.col("q_emb"), F.col("emb")) / (F.col("q_norm") * F.col("norm")), 6
    )
    scored = vecs.join(F.broadcast(q), F.col("vec_id") != F.col("query_id")).select(
        "query_id", "vec_id", rel.alias("rel"), "emb", "norm"
    )
    wq = Window.partitionBy("query_id").orderBy(F.col("rel").desc(), "vec_id")
    cands = materialize(
        scored.withColumn("rk", F.row_number().over(wq))
        .filter(F.col("rk") <= MMR_POOL)
        .drop("rk")
    )

    a = cands.select("query_id", F.col("vec_id").alias("va"),
                     F.col("emb").alias("ea"), F.col("norm").alias("na"))
    b = cands.select("query_id", F.col("vec_id").alias("vb"),
                     F.col("emb").alias("eb"), F.col("norm").alias("nb"))
    pc = materialize(
        a.join(b, "query_id")
        .filter(F.col("va") != F.col("vb"))
        .select(
            "query_id", "va", "vb",
            F.round(
                _dot(F.col("ea"), F.col("eb")) / (F.col("na") * F.col("nb")), 6
            ).alias("c"),
        )
    )

    pool = cands.select("query_id", "vec_id", "rel")
    selected = (
        pool.withColumn("rk", F.row_number().over(wq))
        .filter(F.col("rk") == 1)
        .select("query_id", "vec_id", "rel", F.lit(1).alias("rank"))
        .transform(materialize)
    )
    for k in range(2, MMR_K + 1):
        sel_keys = selected.select("query_id", "vec_id")
        remaining = pool.join(sel_keys, ["query_id", "vec_id"], "left_anti")
        pen = (
            remaining.join(
                pc,
                (pc.query_id == remaining.query_id) & (pc.va == remaining.vec_id),
            )
            .drop(pc.query_id)
            .join(
                sel_keys.select(
                    F.col("query_id").alias("sq"), F.col("vec_id").alias("sv")
                ),
                (F.col("query_id") == F.col("sq")) & (F.col("vb") == F.col("sv")),
            )
            .groupBy("query_id", "vec_id", "rel")
            .agg(F.max("c").alias("pen"))
        )
        mmr = F.round(
            MMR_LAMBDA * F.col("rel") - (1 - MMR_LAMBDA) * F.col("pen"), 6
        )
        wm = Window.partitionBy("query_id").orderBy(mmr.desc(), "vec_id")
        pick = (
            pen.withColumn("rk", F.row_number().over(wm))
            .filter(F.col("rk") == 1)
            .select("query_id", "vec_id", "rel", F.lit(k).alias("rank"))
        )
        selected = selected.unionByName(pick).transform(materialize)
    return selected.select("query_id", "vec_id", F.col("rel").alias("relevance"), "rank")


# ---------------------------------------------------------------------------
# Cluster purity (label entropy per k-means cluster)

@register(
    "kmeans_cluster_purity",
    oracle=f"""
WITH vecs AS ({_SIM_ORACLE_VECS.strip()}),
init AS (
  SELECT vec_id AS cid, emb AS cemb
  FROM vecs ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT {_K}
),
{_oracle_round('init', 'r0').strip()},
{_oracle_cent('r0_a', 'cent1').strip()},
{_oracle_round('cent1', 'r1').strip()},
cl AS (
  SELECT a.cid, v.label, COUNT(*) AS cnt
  FROM r1_a a JOIN vecs v USING (vec_id)
  GROUP BY a.cid, v.label
),
per AS (
  SELECT cid, SUM(cnt) AS n, MAX(cnt) AS maj,
         ROUND(CAST(SUM(CAST(cnt * ROUND(ln(CAST(cnt AS DOUBLE)), 9)
                             AS DECIMAL(18,6))) AS DOUBLE), 6) AS s
  FROM cl GROUP BY cid
)
SELECT cid AS cluster_id, CAST(n AS BIGINT) AS n_members,
       ROUND(CAST(maj AS DOUBLE) / n, 6) AS majority_share,
       ROUND(ROUND(ln(CAST(n AS DOUBLE)), 9) - s / n, 6) AS label_entropy
FROM per
""",
)
def kmeans_cluster_purity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cluster-quality readout: per k-means cluster (the oracle-exact one
    Lloyd round), the label distribution's majority share and Shannon
    entropy — how well unsupervised structure recovers the labels.  Uses
    the H = ln N − Σ n·ln n / N identity with libm logs rounded to 9
    before DECIMAL sums (char_entropy's proven discipline).

    Plan: the broadcast-centroid assignment + one (cluster, label) count
    and one |clusters|-row rollup — nothing after the assignment is
    data-sized."""
    vecs = _sim_vectors(spark, sf_dir).select("vec_id", "label", "emb")
    kvecs = vecs.select("vec_id", "emb")
    cents1 = _update(_assign(kvecs, _init_centroids(kvecs)))
    assign = _assign(kvecs, cents1).select("vec_id", "cid")
    cl = (
        assign.join(vecs.select("vec_id", "label"), "vec_id")
        .groupBy("cid", "label")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    ln_cnt = F.round(F.log(F.col("cnt").cast("double")), 9)
    per = cl.groupBy("cid").agg(
        F.sum("cnt").alias("n"),
        F.max("cnt").alias("maj"),
        F.round(dsum(F.col("cnt") * ln_cnt), 6).alias("s"),
    )
    return per.select(
        F.col("cid").alias("cluster_id"),
        F.col("n").cast("long").alias("n_members"),
        F.round(F.col("maj").cast("double") / F.col("n"), 6).alias("majority_share"),
        F.round(
            F.round(F.log(F.col("n").cast("double")), 9) - F.col("s") / F.col("n"), 6
        ).alias("label_entropy"),
    )


# ---------------------------------------------------------------------------
# DSIR-style importance resampling (Xie et al., 2023: Data Selection with
# Importance Resampling) — the LEARNED complement of domain_mixture_sample:
# instead of fixed per-domain rates, estimate hashed n-gram bag models for
# the TARGET distribution and the RAW corpus, weight every document by its
# importance ratio, and keep it with probability proportional to the ratio
# via a deterministic md5-uniform (capped at 1).
# ---------------------------------------------------------------------------
DSIR_BUCKETS = 512  # hashed feature space (unigram -> bucket)
DSIR_TARGET_LANG = "en"  # the target distribution: English documents
DSIR_TEMP = 5.0  # keep iff ln(u) < TEMP * avg log importance ratio


def _hash24_of(col, salt: str) -> F.Column:
    """First 6 hex chars of md5(salt || value) as a 24-bit integer (the
    _hash24 alphabet-indexing trick, parameterized by salt/column)."""
    h = F.md5(F.concat(F.lit(salt), col.cast("string")))
    v = F.lit(0).cast("bigint")
    for i in range(_MIX_HEX_CHARS):
        v = v + (F.instr(F.lit(_HEX), F.substring(h, i + 1, 1)) - 1).cast("bigint") * (
            16 ** (_MIX_HEX_CHARS - 1 - i)
        )
    return v


def _oracle_hash24_of(expr: str, salt: str) -> str:
    return "(" + " + ".join(
        f"(strpos('{_HEX}', substr(md5('{salt}' || {expr}), {i + 1}, 1)) - 1)"
        f" * {16 ** (_MIX_HEX_CHARS - 1 - i)}"
        for i in range(_MIX_HEX_CHARS)
    ) + ")"


@register(
    "dsir_importance_resample",
    oracle=f"""
WITH words AS (
  SELECT doc_id, lang, unnest(string_split(text, ' ')) AS w FROM documents
),
wb AS (
  SELECT doc_id, lang, {_oracle_hash24_of("w", "dsir|")} % {DSIR_BUCKETS} AS b
  FROM words
),
rc AS (SELECT b, COUNT(*) AS c_r FROM wb GROUP BY b),
tc AS (SELECT b, COUNT(*) AS c_t FROM wb WHERE lang = '{DSIR_TARGET_LANG}' GROUP BY b),
tot AS (SELECT (SELECT COUNT(*) FROM wb) AS n_r,
               (SELECT COUNT(*) FROM wb WHERE lang = '{DSIR_TARGET_LANG}') AS n_t),
delta AS (
  SELECT rc.b,
         ROUND(ln((COALESCE(tc.c_t, 0) + 1.0) / (tot.n_t + {DSIR_BUCKETS}))
             - ln((rc.c_r + 1.0) / (tot.n_r + {DSIR_BUCKETS})), 6) AS d
  FROM rc LEFT JOIN tc USING (b) CROSS JOIN tot
),
scores AS (
  SELECT wb.doc_id, MIN(wb.lang) AS lang,
         ROUND(CAST(SUM(CAST(d AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*), 6) AS avg_lr
  FROM wb JOIN delta USING (b)
  GROUP BY wb.doc_id
),
keyed AS (
  SELECT lang, avg_lr,
         ROUND(ln(({_oracle_hash24_of("CAST(doc_id AS VARCHAR)", "dsiru|")} + 1.0)
                  / {_MIX_SPACE}), 6) AS ln_u
  FROM scores
)
SELECT lang,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(CASE WHEN ln_u < {DSIR_TEMP} * avg_lr THEN 1 ELSE 0 END) AS BIGINT)
         AS n_kept,
       ROUND(CAST(SUM(CAST(avg_lr AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*), 6)
         AS mean_lr
FROM keyed GROUP BY lang
""",
)
def dsir_importance_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR-style data selection: hashed-unigram bag models (add-1
    smoothed over {DSIR_BUCKETS} buckets) for the target distribution
    (lang='{DSIR_TARGET_LANG}') and the raw corpus; each document scores
    its mean per-token log importance ratio ln(p_target/p_raw); keep
    iff ln(u) < {DSIR_TEMP}·score with u a deterministic md5-uniform —
    i.e. keep probability min(1, importance^{DSIR_TEMP}), reproducible
    on any engine, any partitioning.

    Cross-engine exactness: per-bucket deltas rounded to 6 BEFORE the
    DECIMAL per-doc sum (the round-before-reuse discipline); the keep
    comparison multiplies identically-rounded doubles, an exact IEEE op.

    Plan at 100 TB: bucket counts are two map-side-combinable aggregates
    over the token stream; the {DSIR_BUCKETS}-row delta table BROADCASTS
    onto the token scan (no shuffle of the corpus for scoring); per-doc
    scores aggregate on doc_id — one shuffle of (doc_id, bucket) pairs.
    The raw corpus is never re-partitioned by anything global."""
    docs = load(spark, sf_dir, "documents")
    words = docs.select(
        "doc_id", "lang", F.explode(F.split("text", " ")).alias("w")
    )
    wb = words.select(
        "doc_id", "lang", (_hash24_of(F.col("w"), "dsir|") % DSIR_BUCKETS).alias("b")
    )
    # Optimization r13 (guide §2.3): raw counts, target counts, and the
    # two totals used to be THREE separate aggregations over the exploded
    # token stream (each re-running the split+md5-bucket projection).
    # One conditional groupBy("b") pass computes both per-bucket counts;
    # the totals are exact sums of that {DSIR_BUCKETS}-row table — the
    # token stream is now scanned twice in the whole operator (counts +
    # scoring) instead of four times.  c_t = SUM(lang = target) over the
    # bucket ≡ the old inner count with the left join's COALESCE(·, 0);
    # n_r/n_t = the bucket sums ≡ the old global counts.  Identical
    # values into the identical delta formula.
    bc = materialize(  # {DSIR_BUCKETS}-row table feeding tot AND delta
        wb.groupBy("b").agg(
            F.count(F.lit(1)).alias("c_r"),
            F.sum(
                F.when(F.col("lang") == DSIR_TARGET_LANG, 1).otherwise(0)
            ).alias("c_t"),
        )
    )
    tot = bc.agg(
        F.sum("c_r").alias("n_r"),
        F.sum("c_t").alias("n_t"),
    )
    delta = (
        bc.crossJoin(F.broadcast(tot))
        .select(
            "b",
            F.round(
                F.log((F.col("c_t") + 1.0) / (F.col("n_t") + DSIR_BUCKETS))
                - F.log((F.col("c_r") + 1.0) / (F.col("n_r") + DSIR_BUCKETS)),
                6,
            ).alias("d"),
        )
    )
    scores = (
        wb.join(F.broadcast(delta), "b")
        .groupBy("doc_id")
        .agg(
            F.min("lang").alias("lang"),
            F.round(dsum(F.col("d")) / F.count(F.lit(1)), 6).alias("avg_lr"),
        )
    )
    ln_u = F.round(
        F.log(
            (_hash24_of(F.col("doc_id"), "dsiru|") + 1.0) / float(_MIX_SPACE)
        ),
        6,
    )
    keyed = scores.select("lang", "avg_lr", ln_u.alias("ln_u"))
    return keyed.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(
            F.when(F.col("ln_u") < DSIR_TEMP * F.col("avg_lr"), 1).otherwise(0)
        ).cast("bigint").alias("n_kept"),
        F.round(dsum(F.col("avg_lr")) / F.count(F.lit(1)), 6).alias("mean_lr"),
    )


# ---------------------------------------------------------------------------
# EL2N example-difficulty pruning audit (model-based data curation)
# ---------------------------------------------------------------------------
EL2N_DECILES = 10


def _el2n_oracle() -> str:
    from .ml import LOGIT_ROUNDS, _logit_cte_parts

    parts = ",\n".join(_logit_cte_parts())
    # Rank-based deciles in pure INTEGER arithmetic (the ewma device):
    # decile(v) = (rank_before(v) * 10) // N over the per-distinct-value
    # cumulative counts.  Interpolated quantile_cont boundaries were
    # rejected: Spark and DuckDB associate the interpolation differently
    # (lower*(1-f)+higher*f vs lower+(higher-lower)*f), so a boundary one
    # ulp from a digit-6 rounding edge could round apart data-dependently.
    # Ties share a rank, so tied groups can never straddle a decile.
    return f"""
WITH {parts},
scored AS (
  SELECT y,
         ROUND(ABS(ROUND(1.0 / (1.0 + exp(-ROUND(
           w.w0 * x0 + w.w1 * x1 + w.w2 * x2, 3))), 6) - y), 6) AS el2n
  FROM f CROSS JOIN w{LOGIT_ROUNDS} w
),
tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM scored),
vals AS (
  SELECT el2n, CAST(COUNT(*) AS BIGINT) AS cnt FROM scored GROUP BY el2n
),
buckets AS (
  SELECT el2n,
         CAST(((SUM(cnt) OVER (ORDER BY el2n) - cnt) * 10) // n AS INT)
           AS decile
  FROM vals CROSS JOIN tot
)
SELECT b.decile,
       CAST(COUNT(*) AS BIGINT) AS n,
       ROUND(CAST(SUM(CAST(s.el2n AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*), 6)
         AS mean_el2n,
       ROUND(CAST(SUM(y) AS DOUBLE) / COUNT(*), 6) AS pos_rate
FROM scored s JOIN buckets b USING (el2n)
GROUP BY 1
"""


@register("el2n_prune_deciles", oracle=_el2n_oracle())
def el2n_prune_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EL2N data-pruning audit (Paul et al., "Deep Learning on a Data
    Diet"): score every training example by the trained model's error
    norm — for the binary logistic case EL2N = |p - y| — and profile
    the corpus by EL2N decile.  Low deciles are the easy, redundant
    examples a pruning pass drops first; the per-decile positive rate
    shows whether pruning would skew the label mix.  Reuses the
    in-engine GD model (ml.train_logistic), so scores are identical to
    the deployed scorer's.

    Determinism: p and el2n ROUND to 6; deciles are RANK-based in pure
    integer arithmetic — decile(v) = (rank_before(v)·10) div N over the
    per-distinct-value cumulative counts — because interpolated
    percentile boundaries are NOT engine-exact (Spark and DuckDB
    associate lower/higher interpolation differently, the r6 ewma bug
    class).  Ties share a rank, so a tied group never straddles deciles.

    Plan at 100 TB: scoring is a map-side literal projection (weights
    are driver literals); the decile table is a value rollup (≤1e6+1
    distinct 6-dp scores — metadata-sized) with one ordered window over
    THAT rollup, broadcast back over the scan (never an NTILE global
    sort of the fact); the final rollup is a ≤10-group
    map-side-combinable aggregate."""
    from pyspark.sql import Window as W

    from .ml import _logit_features, train_logistic

    w = train_logistic(spark, sf_dir)[-1]
    f = _logit_features(spark, sf_dir)
    z = F.round(
        F.lit(w[0]) * F.col("x0")
        + F.lit(w[1]) * F.col("x1")
        + F.lit(w[2]) * F.col("x2"),
        3,
    )
    p = F.round(1.0 / (1.0 + F.exp(-z)), 6)
    scored = f.select(F.col("y"), F.round(F.abs(p - F.col("y")), 6).alias("el2n"))
    tot = scored.agg(F.count(F.lit(1)).alias("n"))
    vals = scored.groupBy("el2n").agg(F.count(F.lit(1)).alias("cnt"))
    cum = vals.select(
        "el2n",
        "cnt",
        F.sum("cnt")
        .over(W.orderBy("el2n").rowsBetween(W.unboundedPreceding, 0))
        .alias("cum"),
    )
    buckets = cum.crossJoin(F.broadcast(tot)).select(
        "el2n", F.expr("CAST((cum - cnt) * 10 div n AS INT)").alias("decile")
    )
    return (
        scored.join(F.broadcast(buckets), "el2n")
        .groupBy("decile")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(
                F.sum(F.col("el2n").cast("decimal(18,6)")).cast("double")
                / F.count(F.lit(1)),
                6,
            ).alias("mean_el2n"),
            F.round(F.sum("y").cast("double") / F.count(F.lit(1)), 6).alias(
                "pos_rate"
            ),
        )
    )


# ---------------------------------------------------------------------------
# Temperature-scaled domain mixture weights (mT5 alpha-sampling)
# ---------------------------------------------------------------------------
def _pow_alpha_sql(alpha: float) -> str:
    # c^alpha as exp(alpha * ln c) with BOTH transcendentals rounded (ln to
    # 6 before the exact-decimal multiply, exp to 6 after) — POWER() is not
    # used because the two engines' pow need not agree in the last ulp.
    return f"ROUND(exp(ROUND({alpha} * ROUND(ln(CAST(n_docs AS DOUBLE)), 6), 6)), 6)"


@register(
    "temperature_mixture_weights",
    oracle=f"""
WITH c AS (
  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs FROM documents GROUP BY source
),
p AS (
  SELECT source, n_docs,
         {_pow_alpha_sql(0.3)} AS p03,
         {_pow_alpha_sql(0.7)} AS p07
  FROM c
),
tot AS (
  SELECT CAST(SUM(CAST(p03 AS DECIMAL(18,6))) AS DOUBLE) AS s03,
         CAST(SUM(CAST(p07 AS DECIMAL(18,6))) AS DOUBLE) AS s07,
         CAST(SUM(n_docs) AS BIGINT) AS n_total
  FROM p
)
SELECT source, n_docs,
       ROUND(CAST(n_docs AS DOUBLE) / n_total, 6) AS w_raw,
       ROUND(p03 / s03, 6) AS w_a03,
       ROUND(p07 / s07, 6) AS w_a07,
       ROUND((p03 / s03) / (CAST(n_docs AS DOUBLE) / n_total), 6) AS boost_a03
FROM p CROSS JOIN tot
""",
)
def temperature_mixture_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-scaled sampling weights per source (the mT5 / multilingual
    alpha-sampling rule): w_alpha(s) = c_s^alpha / sum c^alpha for
    alpha in {0.3, 0.7} next to the raw share (alpha = 1) — the standard
    knob that upsamples tail domains when assembling a training mixture.
    ``boost_a03`` is each source's upsampling factor at the flattest
    temperature, the number a mixture designer actually reads.

    Determinism: c^alpha goes through exp(alpha·ln c) with ln rounded to 6
    BEFORE the exact multiply and exp rounded to 6 after (POWER() is
    avoided — the engines' pow need not agree in the last ulp); the
    normalizers are exact DECIMAL sums of the 6-dp terms; each final
    ratio is one IEEE division rounded to 6.

    Plan at 100 TB: one ≤n_sources-group partial-aggregated count of the
    corpus, then all arithmetic happens on that metadata-sized rollup
    (broadcast of a one-row total) — the scan is touched exactly once."""
    docs = load(spark, sf_dir, "documents")
    c = docs.groupBy("source").agg(F.count(F.lit(1)).cast("bigint").alias("n_docs"))

    def pow_alpha(alpha: float):
        ln_c = F.round(F.log(F.col("n_docs").cast("double")), 6)
        return F.round(F.exp(F.round(F.lit(alpha) * ln_c, 6)), 6)

    p = c.select(
        "source", "n_docs", pow_alpha(0.3).alias("p03"), pow_alpha(0.7).alias("p07")
    )
    # Normalizers via an unpartitioned window over the per-source ROLLUP
    # (n_sources rows — metadata-sized at any corpus scale): keeps the
    # corpus scan at exactly one, with no self-join re-reading the parquet.
    everything = Window.partitionBy()
    p = p.select(
        "source",
        "n_docs",
        "p03",
        "p07",
        F.sum(F.col("p03").cast("decimal(18,6)"))
        .over(everything)
        .cast("double")
        .alias("s03"),
        F.sum(F.col("p07").cast("decimal(18,6)"))
        .over(everything)
        .cast("double")
        .alias("s07"),
        F.sum("n_docs").over(everything).cast("bigint").alias("n_total"),
    )
    return p.select(
        "source",
        "n_docs",
        F.round(F.col("n_docs").cast("double") / F.col("n_total"), 6).alias("w_raw"),
        F.round(F.col("p03") / F.col("s03"), 6).alias("w_a03"),
        F.round(F.col("p07") / F.col("s07"), 6).alias("w_a07"),
        F.round(
            (F.col("p03") / F.col("s03"))
            / (F.col("n_docs").cast("double") / F.col("n_total")),
            6,
        ).alias("boost_a03"),
    )


# ---------------------------------------------------------------------------
# RHO-loss data selection (reducible holdout loss)
# ---------------------------------------------------------------------------
def _rho_oracle() -> str:
    from .ml import LOGIT_ROUNDS, PRICE_SCALE, SPLIT_SQL, _logit_cte_parts

    parts = _logit_cte_parts(where=SPLIT_SQL["train"], prefix="t")
    parts += _logit_cte_parts(where=SPLIT_SQL["holdout"], prefix="h")
    chains = ",\n".join(parts)
    sig = "LEAST(GREATEST(ROUND(1.0 / (1.0 + exp(-ROUND({w}.w0 * x0 + {w}.w1 * x1 + {w}.w2 * x2, 3))), 6), 0.000001), 0.999999)"
    pm, pi = sig.format(w="wt"), sig.format(w="wh")
    return f"""
WITH {chains},
s AS (
  SELECT o_orderpriority,
         CASE WHEN o_orderstatus = 'F' THEN 1.0 ELSE 0.0 END AS y,
         1.0 AS x0,
         ROUND(o_totalprice / {PRICE_SCALE}.0, 6) AS x1,
         CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1.0 ELSE 0.0 END AS x2
  FROM orders WHERE {SPLIT_SQL["train"]}
),
sc AS (
  SELECT o_orderpriority, y, {pm} AS pm, {pi} AS pi
  FROM s CROSS JOIN wt{LOGIT_ROUNDS} wt CROSS JOIN wh{LOGIT_ROUNDS} wh
),
r AS (
  SELECT o_orderpriority,
         ROUND(ROUND(-ln(CASE WHEN y = 1.0 THEN pm ELSE 1.0 - pm END), 6)
             - ROUND(-ln(CASE WHEN y = 1.0 THEN pi ELSE 1.0 - pi END), 6), 6) AS rho
  FROM sc
),
tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM r),
vals AS (SELECT rho, CAST(COUNT(*) AS BIGINT) AS cnt FROM r GROUP BY rho),
buckets AS (
  SELECT rho,
         CAST(((SUM(cnt) OVER (ORDER BY rho DESC) - cnt) * 4) // n AS INT) AS qb
  FROM vals CROSS JOIN tot
)
SELECT r.o_orderpriority,
       CAST(COUNT(*) AS BIGINT) AS n_train,
       CAST(SUM(CASE WHEN b.qb = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_selected,
       ROUND(CAST(SUM(CASE WHEN b.qb = 0 THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*), 6)
         AS sel_rate,
       ROUND(CAST(SUM(CAST(r.rho AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*), 6)
         AS mean_rho
FROM r JOIN buckets b USING (rho)
GROUP BY 1
"""


@register("rho_loss_selection", oracle=_rho_oracle())
def rho_loss_selection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RHO-loss data selection (Mindermann et al., "Prioritized Training on
    Points that are Learnable, Worth Learning, and Not Yet Learnt"): score
    every training example by its REDUCIBLE loss — cross-entropy under the
    model trained on the train split minus cross-entropy under the
    irreducible-loss model trained on the holdout split — and select the
    top quartile.  High rho = the model still gets it wrong but the
    holdout model shows it is learnable (not label noise); the per-priority
    selection profile shows where the remaining signal lives.  Both models
    are the in-engine GD logistic (ml.train_logistic_split) on a
    deterministic md5-hex 75/25 order-key split.

    Determinism: weights follow the GD round-before-reuse discipline; the
    sigmoid rounds to 6 then clamps to [1e-6, 1-1e-6] so ln never sees 0;
    each loss rounds to 6 after the one ln; rho rounds to 6; the quartile
    is RANK-based pure-integer arithmetic over the per-distinct-rho
    cumulative counts (the el2n device — interpolated percentile
    boundaries are not engine-exact), ties sharing a bucket.

    Plan at 100 TB: two GD trainings = one map-combinable aggregate per
    round per split; scoring is a map-side literal projection; the
    quartile table is a rollup over distinct 6-dp rho values
    (metadata-sized) with one window over THAT rollup, broadcast back;
    the final rollup is a ≤5-group aggregate.  The fact table is never
    globally sorted or re-partitioned."""
    from .ml import PRICE_SCALE, _split_col, train_logistic_split

    w_m = train_logistic_split(spark, sf_dir, "train")[-1]
    w_il = train_logistic_split(spark, sf_dir, "holdout")[-1]
    orders = load(spark, sf_dir, "orders").filter(_split_col("train"))
    # Mirrors ml._logit_features' expressions (kept inline to carry the
    # grouping column through; the oracle's s CTE is the same text).
    s = orders.select(
        "o_orderpriority",
        F.when(F.col("o_orderstatus") == "F", 1.0).otherwise(0.0).alias("y"),
        F.lit(1.0).alias("x0"),
        F.round(F.col("o_totalprice") / float(PRICE_SCALE), 6).alias("x1"),
        F.when(
            F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1.0
        ).otherwise(0.0).alias("x2"),
    )

    def prob(w: list[float]):
        z = F.round(
            F.lit(w[0]) * F.col("x0")
            + F.lit(w[1]) * F.col("x1")
            + F.lit(w[2]) * F.col("x2"),
            3,
        )
        p = F.round(1.0 / (1.0 + F.exp(-z)), 6)
        return F.least(F.greatest(p, F.lit(0.000001)), F.lit(0.999999))

    def loss(p):
        return F.round(
            -F.log(F.when(F.col("y") == 1.0, p).otherwise(1.0 - p)), 6
        )

    # Checkpointed: `r` feeds three plan branches (tot, vals, final join) —
    # Catalyst would otherwise scan the orders fact table three times.
    r = materialize(
        s.select(
            "o_orderpriority",
            F.round(loss(prob(w_m)) - loss(prob(w_il)), 6).alias("rho"),
        )
    )
    tot = r.agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    vals = r.groupBy("rho").agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    cum = vals.select(
        "rho",
        "cnt",
        F.sum("cnt")
        .over(Window.orderBy(F.desc("rho")).rowsBetween(Window.unboundedPreceding, 0))
        .alias("cum"),
    )
    buckets = cum.crossJoin(F.broadcast(tot)).select(
        "rho", F.expr("CAST((cum - cnt) * 4 div n AS INT)").alias("qb")
    )
    sel = F.sum(F.when(F.col("qb") == 0, 1).otherwise(0))
    return (
        r.join(F.broadcast(buckets), "rho")
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_train"),
            sel.cast("bigint").alias("n_selected"),
            F.round(sel.cast("double") / F.count(F.lit(1)), 6).alias("sel_rate"),
            F.round(
                F.sum(F.col("rho").cast("decimal(18,6)")).cast("double")
                / F.count(F.lit(1)),
                6,
            ).alias("mean_rho"),
        )
    )


# ---------------------------------------------------------------------------
# DoReMi-style domain reweighting (excess-loss mixture weights)
# ---------------------------------------------------------------------------
DOREMI_ETA = 2.0  # multiplicative-weights step (literal, engine-exact)

_NLL_TERM_U = "CAST(ROUND(ln(CAST(c AS DOUBLE) / total), 6) AS DECIMAL(18,6))"
_NLL_TERM_B = "CAST(ROUND(ln(CAST(n2 AS DOUBLE) / n1), 6) AS DECIMAL(18,6))"


@register(
    "doremi_domain_reweight",
    oracle=f"""
WITH toks AS (
  SELECT source, list_filter(string_split(text, ' '), w -> w <> '') AS t
  FROM documents
),
uni AS (SELECT source, unnest(t) AS w FROM toks),
cu AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS c FROM uni GROUP BY w),
tu AS (SELECT CAST(COUNT(*) AS BIGINT) AS total FROM uni),
su AS (
  SELECT source,
         ROUND(-(CAST(SUM({_NLL_TERM_U}) AS DOUBLE) / COUNT(*)), 6) AS nll_uni
  FROM uni JOIN cu USING (w) CROSS JOIN tu GROUP BY source
),
big AS (
  SELECT source, unnest(t[1:len(t)-1]) AS w1, unnest(t[2:len(t)]) AS w2
  FROM toks WHERE len(t) >= 2
),
c2 AS (SELECT w1, w2, COUNT(*) AS n2 FROM big GROUP BY w1, w2),
c1 AS (SELECT w1, COUNT(*) AS n1 FROM big GROUP BY w1),
sb AS (
  SELECT source,
         ROUND(-(CAST(SUM({_NLL_TERM_B}) AS DOUBLE) / COUNT(*)), 6) AS nll_big
  FROM big JOIN c2 USING (w1, w2) JOIN c1 USING (w1) GROUP BY source
),
nd AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs FROM documents GROUP BY source),
e AS (
  SELECT source, n_docs, nll_uni, nll_big,
         GREATEST(ROUND(nll_uni - nll_big, 6), 0.0) AS excess
  FROM su JOIN sb USING (source) JOIN nd USING (source)
),
wts AS (
  SELECT source, n_docs, nll_uni, nll_big, excess,
         ROUND(exp(ROUND({DOREMI_ETA} * excess, 6)), 6) AS wgt
  FROM e
),
tw AS (SELECT CAST(SUM(CAST(wgt AS DECIMAL(18,6))) AS DOUBLE) AS s FROM wts)
SELECT source, n_docs, nll_uni, nll_big, excess,
       ROUND(wgt / s, 6) AS alpha
FROM wts CROSS JOIN tw
""",
)
def doremi_domain_reweight(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DoReMi-style domain reweighting (Xie et al., 2023): per source,
    compute the EXCESS loss of a weak proxy model over a stronger
    reference — here mean unigram-LM NLL minus mean bigram-LM NLL, both
    trained in-engine on the corpus itself — clip at 0, and turn it into
    mixture weights by one multiplicative-weights step
    alpha_s ∝ exp(eta · excess_s).  Domains where the weak model lags the
    strong one most (the most learnable headroom) get upweighted; domains
    both models already fit get flattened — the published recipe for
    choosing pretraining mixture proportions without training on every
    candidate mixture.

    Determinism: per-token/per-bigram log-probs round to 6 before exact
    DECIMAL sums (the bigram_lm_doc_score discipline); per-source means
    round to 6; the excess subtraction of two 6-dp doubles is
    correctly-rounded IEEE on both engines, rounded to 6 then clipped;
    exp rounds to 6 after a 6-dp-rounded exact multiply; the normalizer
    is an exact DECIMAL sum.

    Plan at 100 TB: one explode feeds the vocabulary-sized count tables
    AND the scoring joins (all partial-aggregated before their shuffles,
    the TF-IDF shape — AQE absorbs stop-word skew); everything after the
    per-source rollup is metadata-sized."""
    docs = load(spark, sf_dir, "documents")
    toks = F.filter(F.split("text", " "), lambda w: w != "")
    base = docs.select("source", toks.alias("t"))
    uni = base.select("source", F.explode("t").alias("w"))
    cu = uni.groupBy("w").agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    tu = uni.agg(F.count(F.lit(1)).cast("bigint").alias("total"))
    su = (
        uni.join(cu, "w")
        .crossJoin(F.broadcast(tu))
        .select(
            "source",
            F.round(F.log(F.col("c").cast("double") / F.col("total")), 6)
            .cast("decimal(18,6)")
            .alias("lp"),
        )
        .groupBy("source")
        .agg(
            F.round(
                -(F.sum("lp").cast("double") / F.count(F.lit(1))), 6
            ).alias("nll_uni")
        )
    )
    big = (
        base.filter(F.size("t") >= 2)
        .select(
            "source",
            F.explode(
                F.zip_with(
                    F.slice("t", 1, F.size("t") - 1),
                    F.slice("t", 2, F.size("t") - 1),
                    lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
                )
            ).alias("bg"),
        )
        .select("source", "bg.w1", "bg.w2")
    )
    c2 = big.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("n2"))
    c1 = big.groupBy("w1").agg(F.count(F.lit(1)).alias("n1"))
    sb = (
        big.join(c2, ["w1", "w2"])
        .join(c1, ["w1"])
        .select(
            "source",
            F.round(F.log(F.col("n2").cast("double") / F.col("n1")), 6)
            .cast("decimal(18,6)")
            .alias("lp"),
        )
        .groupBy("source")
        .agg(
            F.round(
                -(F.sum("lp").cast("double") / F.count(F.lit(1))), 6
            ).alias("nll_big")
        )
    )
    nd = docs.groupBy("source").agg(F.count(F.lit(1)).cast("bigint").alias("n_docs"))
    e = (
        su.join(sb, "source")
        .join(nd, "source")
        .select(
            "source",
            "n_docs",
            "nll_uni",
            "nll_big",
            F.greatest(
                F.round(F.col("nll_uni") - F.col("nll_big"), 6), F.lit(0.0)
            ).alias("excess"),
        )
    )
    wts = e.withColumn(
        "wgt", F.round(F.exp(F.round(F.lit(DOREMI_ETA) * F.col("excess"), 6)), 6)
    )
    tw = wts.agg(F.sum(F.col("wgt").cast("decimal(18,6)")).cast("double").alias("s"))
    return wts.crossJoin(F.broadcast(tw)).select(
        "source",
        "n_docs",
        "nll_uni",
        "nll_big",
        "excess",
        F.round(F.col("wgt") / F.col("s"), 6).alias("alpha"),
    )


# ---------------------------------------------------------------------------
# Token-budget epoch planning (data-constrained scaling)
# ---------------------------------------------------------------------------
BUDGET_MULT = 2  # total token budget = BUDGET_MULT x unique corpus tokens
EPOCH_CAP = 4  # max useful repeats per domain (data-constrained scaling)


@register(
    "token_budget_epoch_plan",
    oracle=f"""
WITH c AS (
  SELECT source,
         CAST(SUM(len(list_filter(string_split(text, ' '), w -> w <> ''))) AS BIGINT)
           AS n_tokens
  FROM documents GROUP BY source
),
p AS (
  SELECT source, n_tokens,
         ROUND(exp(ROUND(0.5 * ROUND(ln(CAST(n_tokens AS DOUBLE)), 6), 6)), 6) AS pw
  FROM c
),
t AS (
  SELECT source, n_tokens, pw,
         SUM(CAST(pw AS DECIMAL(18,6))) OVER () AS s,
         SUM(n_tokens) OVER () AS total_tokens
  FROM p
),
plan AS (
  SELECT source, n_tokens,
         ROUND(pw / CAST(s AS DOUBLE), 6) AS w,
         CAST(FLOOR(CAST(ROUND(pw / CAST(s AS DOUBLE), 6) AS DECIMAL(18,6))
                    * ({BUDGET_MULT} * total_tokens)) AS BIGINT) AS target_tokens
  FROM t
)
SELECT source, n_tokens, w, target_tokens,
       ROUND(CAST(target_tokens AS DOUBLE) / n_tokens, 6) AS epochs_uncapped,
       LEAST(target_tokens, {EPOCH_CAP} * n_tokens) AS effective_tokens,
       ROUND(CAST(LEAST(target_tokens, {EPOCH_CAP} * n_tokens) AS DOUBLE)
             / n_tokens, 6) AS epochs
FROM plan
""",
)
def token_budget_epoch_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget epoch planning under data-constrained scaling
    (Muennighoff et al., 2023): given a total training budget of
    {BUDGET_MULT}x the unique corpus tokens and temperature-flattened
    target shares (alpha = 0.5 over per-source token counts), compute
    each source's target tokens, the repeat factor that implies, and the
    effective allocation after capping repeats at {EPOCH_CAP} epochs —
    past which repeated data stops buying loss.  This is the planning
    artifact a mixture designer derives BEFORE launching a run: which
    domains are repeat-limited and where the surplus budget is stranded.

    Determinism: token counts are exact integer sums; the alpha power
    goes through the exp/ln rounding discipline; the target-token
    allocation multiplies the 6-dp weight as an EXACT DECIMAL by the
    integer budget before FLOOR (a double product could sit one ulp
    under an integer and floor apart across engines); caps and
    effective tokens are pure integer arithmetic.

    Plan at 100 TB: ONE corpus scan into a per-source rollup; the
    normalizer and total-token windows run over that n_sources-row
    rollup — all planning arithmetic is metadata-sized."""
    docs = load(spark, sf_dir, "documents")
    ntok = F.size(F.filter(F.split("text", " "), lambda w: w != ""))
    c = docs.select("source", ntok.alias("tk")).groupBy("source").agg(
        F.sum("tk").cast("bigint").alias("n_tokens")
    )
    pw = F.round(
        F.exp(F.round(F.lit(0.5) * F.round(F.log(F.col("n_tokens").cast("double")), 6), 6)),
        6,
    )
    p = c.select("source", "n_tokens", pw.alias("pw"))
    everything = Window.partitionBy()
    t = p.select(
        "source",
        "n_tokens",
        "pw",
        F.sum(F.col("pw").cast("decimal(18,6)")).over(everything).alias("s"),
        F.sum("n_tokens").over(everything).alias("total_tokens"),
    )
    w = F.round(F.col("pw") / F.col("s").cast("double"), 6)
    target = F.floor(
        w.cast("decimal(18,6)") * (F.lit(BUDGET_MULT) * F.col("total_tokens"))
    ).cast("bigint")
    plan = t.select(
        "source", "n_tokens", w.alias("w"), target.alias("target_tokens")
    )
    eff = F.least(
        F.col("target_tokens"), F.lit(EPOCH_CAP) * F.col("n_tokens")
    )
    return plan.select(
        "source",
        "n_tokens",
        "w",
        "target_tokens",
        F.round(F.col("target_tokens").cast("double") / F.col("n_tokens"), 6).alias(
            "epochs_uncapped"
        ),
        eff.alias("effective_tokens"),
        F.round(eff.cast("double") / F.col("n_tokens"), 6).alias("epochs"),
    )


# ---------------------------------------------------------------------------
# Benchmark contamination audit (n-gram level)
# ---------------------------------------------------------------------------
CONTAM_N = 5  # n-gram order: long enough that shared grams mean real overlap
CONTAM_TOP = 50

# Deterministic ~1/16 "benchmark" slice, keyed independently of every other
# md5 split in the engine ('bench|' prefix).
_BENCH_SQL = "substr(md5('bench|' || CAST(doc_id AS VARCHAR)), 1, 1) = '0'"


@register(
    "contamination_ngram_audit",
    oracle=f"""
WITH toked AS (
  SELECT doc_id, list_filter(string_split(text, ' '), w -> w <> '') AS t
  FROM documents
),
grams AS (
  SELECT doc_id, array_to_string(t[i:i+{CONTAM_N - 1}], ' ') AS gram
  FROM (SELECT doc_id, t, unnest(range(1, len(t) - {CONTAM_N - 2})) AS i
        FROM toked WHERE len(t) >= {CONTAM_N})
),
bench AS (SELECT DISTINCT gram FROM grams WHERE {_BENCH_SQL.replace("doc_id", "grams.doc_id")}),
train AS (SELECT * FROM grams WHERE NOT ({_BENCH_SQL.replace("doc_id", "grams.doc_id")})),
per_doc AS (
  SELECT t.doc_id,
         CAST(COUNT(*) AS BIGINT) AS n_grams,
         CAST(SUM(CASE WHEN b.gram IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
           AS n_hits
  FROM train t LEFT JOIN bench b ON b.gram = t.gram
  GROUP BY t.doc_id
)
SELECT doc_id, n_grams, n_hits,
       ROUND(CAST(n_hits AS DOUBLE) / n_grams, 6) AS contamination_rate
FROM per_doc
ORDER BY contamination_rate DESC, doc_id
LIMIT {CONTAM_TOP}
""",
)
def contamination_ngram_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark-contamination audit at the n-gram level: hold out a
    deterministic md5 slice of documents as the "benchmark", then for
    every training document count how many of its {CONTAM_N}-gram
    positions also appear anywhere in the benchmark — the standard
    train/test contamination check (GPT-3 appendix C shape) run INSIDE
    the engine; top-{CONTAM_TOP} most contaminated docs surface for
    removal.  Complements split_leakage_audit (MinHash, whole-doc
    near-dup) with exact sub-document overlap.

    Determinism: integer counts, one IEEE division rounded to 6,
    TakeOrdered tie-break by doc_id.

    Plan at 100 TB: grams are map-side explodes; the only shuffle is the
    gram-keyed LEFT JOIN of training positions against the DISTINCT
    benchmark gram set (benchmark ≪ corpus, typically broadcastable;
    here left as a hash join so skewed grams split under AQE).  Nothing
    is pairwise-by-document."""
    from ..sources.tables import load_spread

    docs = load_spread(spark, sf_dir, "documents")
    t = F.filter(F.split(F.col("text"), " "), lambda w: w != "")
    toked = docs.select("doc_id", t.alias("t")).filter(
        F.size("t") >= CONTAM_N
    )
    # NOT materialized: checkpointing the exploded gram table would force
    # ~5x corpus tokens into executor storage — the multi-corpus-size
    # materialization this operator's plan claim forbids (r9 self-review).
    # Only the DISTINCT benchmark gram set (bench ≪ corpus, the join's
    # build side) is materialized; the train branch streams map-side, and
    # the only duplicated work is the cheap per-task tokenize+explode.
    grams = toked.select(
        "doc_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.size("t") - (CONTAM_N - 1)),
                lambda i: F.concat_ws(" ", F.slice("t", i, CONTAM_N)),
            )
        ).alias("gram"),
    )
    is_bench = (
        F.substring(
            F.md5(F.concat(F.lit("bench|"), F.col("doc_id").cast("string"))), 1, 1
        )
        == "0"
    )
    bench = materialize(grams.filter(is_bench).select("gram").distinct())
    train = grams.filter(~is_bench)
    per_doc = (
        train.join(
            bench.withColumn("_hit", F.lit(1)), "gram", "left"
        )
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_grams"),
            F.sum(F.coalesce(F.col("_hit"), F.lit(0))).cast("bigint").alias("n_hits"),
        )
    )
    return (
        per_doc.select(
            "doc_id",
            "n_grams",
            "n_hits",
            F.round(F.col("n_hits").cast("double") / F.col("n_grams"), 6).alias(
                "contamination_rate"
            ),
        )
        .orderBy(F.col("contamination_rate").desc(), "doc_id")
        .limit(CONTAM_TOP)
    )


# ---------------------------------------------------------------------------
# PII detection / redaction accounting
# ---------------------------------------------------------------------------
# Patterns written in the regex subset Java (Spark) and RE2 (DuckDB) share:
# char classes, bounded repeats, \d, word alternatives — no lookaround.
PII_PATTERNS = {
    "email": r"[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z][a-z]+",
    "ipv4": r"\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}",
    "phone": r"\d{3}[- ]\d{3}[- ]\d{4}",
}


@register(
    "pii_redaction_stats",
    oracle=f"""
WITH per AS (
  SELECT doc_id, lang,
         {", ".join(
             f"len(regexp_extract_all(text, '{p}')) AS n_{k}"
             for k, p in PII_PATTERNS.items()
         )}
  FROM documents
)
SELECT lang,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       {", ".join(f"CAST(SUM(n_{k}) AS BIGINT) AS total_{k}" for k in PII_PATTERNS)},
       CAST(SUM(CASE WHEN {" + ".join(f"n_{k}" for k in PII_PATTERNS)} > 0
                THEN 1 ELSE 0 END) AS BIGINT) AS docs_with_pii
FROM per GROUP BY lang ORDER BY lang
""",
)
def pii_redaction_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrub accounting per language: counts of email / IPv4 / phone
    pattern hits and the number of documents carrying any — the report a
    redaction pass emits before rewriting text (the rewrite itself is
    ``regexp_replace`` with the same patterns; the audit is what needs
    cross-engine exactness).  Patterns stay inside the Java∩RE2 regex
    subset so both engines tokenize identically; the synthetic fixture
    contains no PII (all-zero counts is the CORRECT answer here — the
    planted-document pytest proves detection).

    Plan at 100 TB: pure map-side regexp_extract_all counts + one
    lang-keyed aggregate; no UDF, no shuffle of text."""
    docs = load(spark, sf_dir, "documents")
    per = docs.select(
        "lang",
        *[
            # Spark SQL string literals consume backslash escapes ('\d'
            # parses as 'd'), silently defanging the pattern — double
            # them; DuckDB's standard SQL strings pass '\d' through, so
            # the oracle embeds the pattern verbatim.  The planted-PII
            # pytest is what catches this class of bug (both engines
            # agree on zero hits over the clean fixture).
            F.size(
                F.expr(
                    f"regexp_extract_all(text, '{p.replace(chr(92), chr(92) * 2)}', 0)"
                )
            ).alias(f"n_{k}")
            for k, p in PII_PATTERNS.items()
        ],
    )
    any_pii = sum(F.col(f"n_{k}") for k in PII_PATTERNS) > 0
    return (
        per.groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            *[
                F.sum(f"n_{k}").cast("bigint").alias(f"total_{k}")
                for k in PII_PATTERNS
            ],
            F.sum(F.when(any_pii, 1).otherwise(0))
            .cast("bigint")
            .alias("docs_with_pii"),
        )
        .orderBy("lang")
    )


# ---------------------------------------------------------------------------
# UniMax epoch-capped uniform mixture (Chung et al. 2023)
# ---------------------------------------------------------------------------
UNIMAX_EPOCH_CAP = 3  # no domain repeats more than this many epochs
UNIMAX_BUDGET_X = 2  # training budget = this multiple of the corpus tokens


@register(
    "unimax_epoch_weights",
    oracle=f"""
WITH dom AS (
  SELECT source, lang,
         CAST(SUM(len(list_filter(string_split(text, ' '), w -> w <> '')))
              AS BIGINT) AS n_tok,
         CAST({UNIMAX_EPOCH_CAP} * SUM(len(list_filter(string_split(text, ' '),
              w -> w <> ''))) AS BIGINT) AS cap
  FROM documents GROUP BY source, lang
),
tot AS (
  SELECT CAST({UNIMAX_BUDGET_X} * SUM(n_tok) AS BIGINT) AS budget,
         CAST(COUNT(*) AS BIGINT) AS n_dom
  FROM dom
),
ordered AS (
  SELECT d.*, t.budget, t.n_dom,
         ROW_NUMBER() OVER (ORDER BY cap, source, lang) AS i,
         CAST(COALESCE(SUM(cap) OVER (ORDER BY cap, source, lang
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
              AS BIGINT) AS prefix_cap
  FROM dom d CROSS JOIN tot t
),
flagged AS (
  SELECT *, CASE WHEN cap * (n_dom - i + 1) + prefix_cap <= budget
                 THEN 1 ELSE 0 END AS is_capped
  FROM ordered
),
pooled AS (
  SELECT *,
         CAST(SUM(CASE WHEN is_capped = 1 THEN cap ELSE 0 END) OVER ()
              AS BIGINT) AS capped_total,
         CAST(SUM(is_capped) OVER () AS BIGINT) AS n_capped
  FROM flagged
),
alloc AS (
  SELECT *, CASE WHEN is_capped = 1 THEN CAST(cap AS DOUBLE)
                 ELSE ROUND(CAST(budget - capped_total AS DOUBLE)
                            / (n_dom - n_capped), 6) END AS alloc_tokens
  FROM pooled
)
SELECT source, lang, n_tok, cap AS cap_tokens, CAST(is_capped AS INT) AS is_capped,
       alloc_tokens,
       ROUND(alloc_tokens / n_tok, 6) AS epochs,
       ROUND(alloc_tokens / budget, 6) AS weight
FROM alloc
ORDER BY source, lang
""",
)
def unimax_epoch_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UniMax mixture weights (Chung et al. 2023): spread a token budget
    of {UNIMAX_BUDGET_X}× the corpus as UNIFORMLY as possible across
    (source, lang) domains, subject to no domain repeating more than
    {UNIMAX_EPOCH_CAP} epochs — the fairness-first alternative to
    temperature sampling that never over-boils a tail domain.  The
    waterfill is closed-form over the capacity-sorted domain rollup:
    domain i (capacities ascending) is capped iff even granting every
    remaining domain its own capacity-sized share would still fit the
    leftover budget — i.e. cap_i·(N-i+1) + Σ_{{j<i}} cap_j ≤ B — and the
    uncapped rest split the remainder evenly.

    Determinism: the fill condition and every operand up to the final
    share are exact bigint arithmetic; the uniform share and the derived
    epochs/weight columns are single IEEE divisions rounded to 6.

    Plan at 100 TB: ONE partial-aggregated scan rolls the corpus up to
    |sources|×|langs| rows; the waterfill's windows run unpartitioned
    over that metadata-sized rollup (tens of rows regardless of corpus
    bytes), so the whole planner costs a scan + one tiny shuffle."""
    docs = load(spark, sf_dir, "documents")
    ntok = F.size(F.filter(F.split("text", " "), lambda w: w != ""))
    dom = docs.groupBy("source", "lang").agg(
        F.sum(ntok).cast("bigint").alias("n_tok")
    )
    return unimax_waterfill(dom)


def unimax_waterfill(dom: DataFrame) -> DataFrame:
    """The closed-form waterfill over a (source, lang, n_tok) domain
    rollup — split out so property tests can drive it with generated
    rollups (tests/test_properties.py checks it against a sequential
    Python reference on arbitrary domain sets)."""
    dom = dom.withColumn(
        "cap", (F.lit(UNIMAX_EPOCH_CAP) * F.col("n_tok")).cast("bigint")
    )
    tot = dom.agg(
        (F.lit(UNIMAX_BUDGET_X) * F.sum("n_tok")).cast("bigint").alias("budget"),
        F.count(F.lit(1)).cast("bigint").alias("n_dom"),
    )
    fill_order = [F.col("cap"), F.col("source"), F.col("lang")]
    w_prefix = (
        Window.orderBy(*fill_order)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    ordered = dom.crossJoin(F.broadcast(tot)).select(
        "*",
        F.row_number().over(Window.orderBy(*fill_order)).alias("i"),
        F.coalesce(F.sum("cap").over(w_prefix), F.lit(0))
        .cast("bigint")
        .alias("prefix_cap"),
    )
    flagged = ordered.withColumn(
        "is_capped",
        F.when(
            F.col("cap") * (F.col("n_dom") - F.col("i") + 1) + F.col("prefix_cap")
            <= F.col("budget"),
            1,
        ).otherwise(0),
    )
    everything = Window.partitionBy()
    pooled = flagged.select(
        "*",
        F.sum(F.when(F.col("is_capped") == 1, F.col("cap")).otherwise(0))
        .over(everything)
        .cast("bigint")
        .alias("capped_total"),
        F.sum("is_capped").over(everything).cast("bigint").alias("n_capped"),
    )
    alloc = pooled.withColumn(
        "alloc_tokens",
        F.when(F.col("is_capped") == 1, F.col("cap").cast("double")).otherwise(
            F.round(
                (F.col("budget") - F.col("capped_total")).cast("double")
                / (F.col("n_dom") - F.col("n_capped")),
                6,
            )
        ),
    )
    return alloc.select(
        "source",
        "lang",
        "n_tok",
        F.col("cap").alias("cap_tokens"),
        F.col("is_capped").cast("int").alias("is_capped"),
        "alloc_tokens",
        F.round(F.col("alloc_tokens") / F.col("n_tok"), 6).alias("epochs"),
        F.round(F.col("alloc_tokens") / F.col("budget"), 6).alias("weight"),
    ).orderBy("source", "lang")
