"""Lexical (sparse-vector) all-pairs document similarity.

The dense-embedding near-dup family (operators/similarity.py) catches
semantic duplicates; its lexical complement — cosine over term-frequency
vectors through an inverted index — catches reworded boilerplate and
templated pages whose embeddings may drift.  This is the classic all-pairs
similarity-search shape (inverted-index candidate generation + exact
verification), the third member of the candidates→verify pattern beside
MinHash→Jaccard and sign-LSH→cosine.

Exactness across engines: everything until the final cosine is INTEGER
arithmetic (tf counts, dot products, squared norms — bit-identical
anywhere); the one double op is ``dot / sqrt(na*nb)``, and IEEE 754
requires division and sqrt to be correctly rounded, so even that is
bit-identical in Spark and DuckDB (na*nb stays far below 2^53).  No
rounding tricks needed — the oracle checks exact values.

Scale notes (100 TB):
- The inverted-index join costs Σ_w df(w)² pairs.  Stop-words are pruned
  by document frequency BEFORE the join (df > DF_CAP_RATIO of docs) —
  the standard prefix-filtering trade: ubiquitous terms contribute
  near-zero discrimination but dominate Σ df², so dropping them bounds
  bucket sizes the same way LSH band caps do (dedup.py HOT_BUCKET_CAP).
- Everything shuffles on content keys (word, then the pair) with
  map-side combines; no N² step anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.numerics import dsum
from ..registry import register
from ..sources.tables import load, load_spread

# prune words present in more than this fraction of documents (stop-words)
DF_CAP_RATIO = 0.25
# report pairs with tf-cosine at or above this
TAU = 0.8

_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, unnest(list_filter(string_split(lower(text), ' '), w -> w <> '')) AS word
  FROM documents
),
tf AS (
  SELECT doc_id, word, COUNT(*) AS tf FROM toks GROUP BY doc_id, word
),
n_docs AS (SELECT COUNT(DISTINCT doc_id) AS n FROM tf),
kept AS (
  SELECT tf.* FROM tf
  JOIN (SELECT word, COUNT(*) AS df FROM tf GROUP BY word) d USING (word)
  WHERE d.df <= (SELECT n FROM n_docs) * {DF_CAP_RATIO}
),
norms AS (
  SELECT doc_id, SUM(tf * tf) AS nrm FROM kept GROUP BY doc_id
),
dots AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         CAST(SUM(a.tf * b.tf) AS BIGINT) AS dot
  FROM kept a JOIN kept b ON a.word = b.word AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
)
SELECT doc_a, doc_b, dot,
       dot / sqrt(CAST(na.nrm * nb.nrm AS DOUBLE)) AS cos_sim
FROM dots
JOIN norms na ON na.doc_id = doc_a
JOIN norms nb ON nb.doc_id = doc_b
WHERE dot / sqrt(CAST(na.nrm * nb.nrm AS DOUBLE)) >= {TAU}
"""


@register("lexical_cosine_pairs", oracle=_ORACLE)
def lexical_cosine_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All document pairs with term-frequency cosine ≥ {TAU}, generated
    through a df-pruned inverted index — never an N² comparison.

    Pipeline: tokenize → per-(doc, word) tf → drop stop-words by document
    frequency → self-join the inverted index on word, accumulating the
    integer dot product with a map-side-combined SUM → join the two
    (tiny) squared-norm rows → exact cosine filter.
    """
    tf = (
        load_spread(spark, sf_dir, "documents")
        .select(
            "doc_id",
            F.explode(F.split(F.lower(F.col("text")), " ")).alias("word"),
        )
        .filter(F.col("word") != "")
        .groupBy("doc_id", "word")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    df = tf.groupBy("word").agg(F.count(F.lit(1)).alias("df"))
    # corpus size as a 1-row broadcast, not a driver-side count — the plan
    # stays fully lazy/distributed
    n_docs = tf.agg(F.countDistinct("doc_id").alias("n"))
    keep_words = (
        df.crossJoin(F.broadcast(n_docs))
        .filter(F.col("df") <= F.col("n") * DF_CAP_RATIO)
        .select("word")
    )
    kept = tf.join(F.broadcast(keep_words), "word")
    norms = kept.groupBy("doc_id").agg(F.sum(F.col("tf") * F.col("tf")).alias("nrm"))
    a = kept.select(F.col("doc_id").alias("doc_a"), "word", F.col("tf").alias("tf_a"))
    b = kept.select(F.col("doc_id").alias("doc_b"), "word", F.col("tf").alias("tf_b"))
    dots = (
        a.join(b, "word")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.sum(F.col("tf_a") * F.col("tf_b")).alias("dot"))
    )
    na = norms.select(F.col("doc_id").alias("doc_a"), F.col("nrm").alias("na"))
    nb = norms.select(F.col("doc_id").alias("doc_b"), F.col("nrm").alias("nb"))
    cos = F.col("dot") / F.sqrt((F.col("na") * F.col("nb")).cast("double"))
    return (
        dots.join(na, "doc_a")
        .join(nb, "doc_b")
        .select("doc_a", "doc_b", "dot", cos.alias("cos_sim"))
        .filter(F.col("cos_sim") >= TAU)
    )


# ---------------------------------------------------------------------------
# BM25 keyword retrieval

BM25_QUERY = ("hash", "scan", "merge")  # fixture-vocab query terms
BM25_K1 = 1.2
BM25_B = 0.75
BM25_TOP = 20

_Q_IN = ", ".join(f"'{t}'" for t in BM25_QUERY)


@register(
    "bm25_keyword_search",
    oracle=f"""
WITH toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents
),
toks_ne AS (SELECT * FROM toks WHERE w <> ''),
dl AS (SELECT doc_id, COUNT(*) AS dl FROM toks_ne GROUP BY doc_id),
stats AS (
  SELECT COUNT(*) AS n,
         ROUND(CAST(SUM(CAST(dl AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*), 6) AS avgdl
  FROM dl
),
tf AS (
  SELECT doc_id, w, COUNT(*) AS tf
  FROM toks_ne WHERE w IN ({_Q_IN}) GROUP BY doc_id, w
),
dfreq AS (SELECT w, COUNT(*) AS df FROM tf GROUP BY w),
contrib AS (
  SELECT t.doc_id,
         ROUND(ROUND(ln((s.n - d.df + 0.5) / (d.df + 0.5) + 1.0), 9)
               * (t.tf * {BM25_K1 + 1.0})
               / (t.tf + {BM25_K1} * ({1.0 - BM25_B} + {BM25_B} * l.dl / s.avgdl)),
               6) AS c
  FROM tf t JOIN dfreq d USING (w) JOIN dl l USING (doc_id) CROSS JOIN stats s
),
scored AS (
  SELECT doc_id, ROUND(CAST(SUM(CAST(c AS DECIMAL(18,6))) AS DOUBLE), 6) AS bm25
  FROM contrib GROUP BY doc_id
)
SELECT doc_id, bm25 FROM scored ORDER BY bm25 DESC, doc_id LIMIT {BM25_TOP}
""",
)
def bm25_keyword_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 keyword retrieval over the corpus — the ranking function a
    corpus search / RAG-retrieval layer runs.  Query = the literal terms
    {BM25_QUERY}; idf uses the Robertson ``ln((N-df+0.5)/(df+0.5)+1)``
    form; libm logs rounded to 9 and per-term contributions to 6 before
    the DECIMAL sum, so scores are engine-exact (char_entropy's proven
    rounding discipline).

    Plan: one explode feeds both the doc-length and term-frequency
    branches; (N, avgdl) is a broadcast 1-row aggregate and df a
    broadcast |terms|-row one; the final ranking is
    TakeOrderedAndProject (top-{BM25_TOP}, no global sort).  At scale
    the tf table IS the inverted-index posting list, partitioned by
    term."""
    docs = load_spread(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.explode(F.split("text", " ")).alias("w")
    ).filter(F.col("w") != "")
    dl = toks.groupBy("doc_id").agg(F.count(F.lit(1)).alias("dl"))
    stats = dl.agg(
        F.count(F.lit(1)).alias("n"),
        F.round(dsum(F.col("dl")) / F.count(F.lit(1)), 6).alias("avgdl"),
    )
    tf = (
        toks.filter(F.col("w").isin(*BM25_QUERY))
        .groupBy("doc_id", "w")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    dfreq = tf.groupBy("w").agg(F.count(F.lit(1)).alias("df"))
    idf = F.round(
        F.log((F.col("n") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0), 9
    )
    denom = F.col("tf") + BM25_K1 * (
        (1.0 - BM25_B) + BM25_B * F.col("dl") / F.col("avgdl")
    )
    contrib = (
        tf.join(F.broadcast(dfreq), "w")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .select(
            "doc_id",
            F.round(idf * (F.col("tf") * (BM25_K1 + 1.0)) / denom, 6).alias("c"),
        )
    )
    return (
        contrib.groupBy("doc_id")
        .agg(F.round(dsum(F.col("c")), 6).alias("bm25"))
        .orderBy(F.col("bm25").desc(), "doc_id")
        .limit(BM25_TOP)
    )


@register(
    "positional_index_terms",
    oracle=f"""
WITH toks AS (
  SELECT doc_id, CAST(t.i - 1 AS INT) AS pos, t.w
  FROM documents,
       LATERAL (SELECT UNNEST(string_split(text, ' ')) AS w,
                       generate_subscripts(string_split(text, ' '), 1) AS i) t
  WHERE t.w IN ({_Q_IN})
)
SELECT w AS word, doc_id,
       CAST(COUNT(*) AS BIGINT) AS tf,
       array_to_string(list_sort(list(pos)), ',') AS positions
FROM toks GROUP BY w, doc_id
""",
)
def positional_index_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Positional inverted-index build for the BM25 query terms: per
    (term, document), the term frequency and the SORTED token-position
    list (emitted comma-joined: the driver compare hashes scalars) — the posting-list structure phrase and proximity queries need
    on top of bm25_keyword_search's ranking.

    Plan: posexplode keeps the position during tokenization (map-side);
    one (term, doc) aggregate with a sorted collect_list — at scale the
    aggregate's key IS the posting-list partitioning (index partitioned
    by term)."""
    docs = load_spread(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.posexplode(F.split("text", " ")).alias("pos", "w")
    ).filter(F.col("w").isin(*BM25_QUERY))
    return toks.groupBy(F.col("w").alias("word"), "doc_id").agg(
        F.count(F.lit(1)).alias("tf"),
        F.array_join(
            F.array_sort(F.collect_list(F.col("pos").cast("int"))), ","
        ).alias("positions"),
    )


# ---------------------------------------------------------------------------
# Reciprocal-rank fusion: hybrid lexical + semantic retrieval
# ---------------------------------------------------------------------------
RRF_K = 60
RRF_TOP = 15
RRF_QUERY_VEC = 0  # the query embedding: vector 0 of the embeddings table


def _rrf_oracle() -> str:
    from ..registry import get_spec

    bm25 = get_spec("bm25_keyword_search").oracle.strip()
    return f"""
WITH lex AS (
  SELECT doc_id AS id,
         CAST(ROW_NUMBER() OVER (ORDER BY bm25 DESC, doc_id) AS INT) AS rank_lex
  FROM ({bm25}) b
),
vecs AS (
  SELECT vec_id,
         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb,
         sqrt(list_sum(list_transform(embedding,
              x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS norm
  FROM embeddings
),
q AS (SELECT emb AS q_emb, norm AS q_norm FROM vecs
      WHERE vec_id = {RRF_QUERY_VEC}),
flat AS (
  SELECT v.vec_id, q.q_norm, v.norm, unnest(q.q_emb) AS qx, unnest(v.emb) AS vx
  FROM q JOIN vecs v ON v.vec_id <> {RRF_QUERY_VEC}
),
semscore AS (
  SELECT vec_id,
         ROUND(SUM(qx * vx) / (ANY_VALUE(q_norm) * ANY_VALUE(norm)), 6) AS score
  FROM flat GROUP BY vec_id
),
sem AS (
  SELECT vec_id AS id,
         CAST(ROW_NUMBER() OVER (ORDER BY score DESC, vec_id) AS INT) AS rank_sem
  FROM semscore QUALIFY rank_sem <= {RRF_TOP + 5}
),
fused AS (
  SELECT COALESCE(lex.id, sem.id) AS id, lex.rank_lex, sem.rank_sem,
         ROUND(COALESCE(1.0 / ({RRF_K} + lex.rank_lex), 0)
               + COALESCE(1.0 / ({RRF_K} + sem.rank_sem), 0), 6) AS rrf
  FROM lex FULL OUTER JOIN sem ON lex.id = sem.id
)
SELECT id, rank_lex, rank_sem, rrf FROM fused
ORDER BY rrf DESC, id LIMIT {RRF_TOP}
"""


@register("rrf_hybrid_retrieval", oracle=_rrf_oracle())
def rrf_hybrid_retrieval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval by reciprocal-rank fusion: the BM25 keyword
    ranking and a semantic ranking (cosine against a query embedding —
    vector {RRF_QUERY_VEC}) are fused with
    ``rrf(d) = Σ 1/({RRF_K} + rank_list(d))`` — the standard hybrid
    search join that needs no score calibration between the two lists
    (ranks only), which is exactly why engines ship it.

    Ranks are small integers and the fused score an exact rational, so
    the fusion is engine-exact; component scores reuse the established
    rounding discipline of their operators verbatim.

    Plan at 100 TB: both component rankings end in
    TakeOrderedAndProject top-k; the fusion is a full-outer join of two
    ≤k-row lists — metadata-sized, broadcast trivially.  The heavy
    lifting stays in the component operators' banded / posting-list
    plans."""
    from ..registry import get_spec
    from .similarity import _vectors

    lex_base = get_spec("bm25_keyword_search").fn(spark, sf_dir)
    w_lex = Window.orderBy(F.desc("bm25"), F.asc("doc_id"))
    lex = lex_base.select(
        F.col("doc_id").alias("id"),
        F.row_number().over(w_lex).cast("int").alias("rank_lex"),
    )
    vecs = _vectors(spark, sf_dir)
    q = vecs.filter(F.col("vec_id") == RRF_QUERY_VEC).select(
        F.col("emb").alias("q_emb"), F.col("norm").alias("q_norm")
    )
    dot = F.aggregate(
        F.zip_with("q_emb", "emb", lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    semscore = (
        vecs.filter(F.col("vec_id") != RRF_QUERY_VEC)
        .crossJoin(F.broadcast(q))
        .select(
            "vec_id",
            F.round(dot / (F.col("q_norm") * F.col("norm")), 6).alias("score"),
        )
    )
    sem = (
        semscore.orderBy(F.desc("score"), "vec_id")
        .limit(RRF_TOP + 5)
        .select(
            F.col("vec_id").alias("id"),
            F.row_number()
            .over(Window.orderBy(F.desc("score"), F.asc("vec_id")))
            .cast("int")
            .alias("rank_sem"),
        )
    )
    fused = (
        lex.withColumnRenamed("id", "lid")
        .join(sem.withColumnRenamed("id", "sid"), F.col("lid") == F.col("sid"), "full")
        .select(
            F.coalesce(F.col("lid"), F.col("sid")).alias("id"),
            "rank_lex",
            "rank_sem",
            F.round(
                F.coalesce(1.0 / (RRF_K + F.col("rank_lex")), F.lit(0.0))
                + F.coalesce(1.0 / (RRF_K + F.col("rank_sem")), F.lit(0.0)),
                6,
            ).alias("rrf"),
        )
    )
    return fused.orderBy(F.desc("rrf"), "id").limit(RRF_TOP)


# ---------------------------------------------------------------------------
# Tokenizer-vocabulary coverage: OOV rate per language against the corpus
# top-N vocabulary — the go/no-go statistic before committing a tokenizer.
# ---------------------------------------------------------------------------
VOCAB_TOP_N = 500


@register(
    "vocab_oov_stats",
    oracle=f"""
WITH tok AS (
  SELECT lang,
         unnest(list_filter(string_split(lower(text), ' '), w -> w <> '')) AS word
  FROM documents
),
vocab AS (
  SELECT word FROM (SELECT word, COUNT(*) AS c FROM tok GROUP BY word)
  ORDER BY c DESC, word LIMIT {VOCAB_TOP_N}
)
SELECT t.lang,
       CAST(COUNT(*) AS BIGINT) AS total_tokens,
       CAST(SUM(CASE WHEN v.word IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS oov_tokens,
       ROUND(CAST(SUM(CASE WHEN v.word IS NULL THEN 1 ELSE 0 END) AS DOUBLE)
             / COUNT(*), 6) AS oov_rate
FROM tok t LEFT JOIN vocab v ON v.word = t.word
GROUP BY t.lang ORDER BY t.lang
""",
)
def vocab_oov_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Out-of-vocabulary rate per language against the corpus-global
    top-{N} vocabulary (frequency desc, word asc tie-break — the
    boundary is deterministic on both engines).

    Scale: token counts aggregate with map-side combine on the word
    key; the vocabulary itself is a top-N (TakeOrderedAndProject, no
    global sort) and is broadcast back against the token stream, so the
    coverage join adds NO shuffle — at 100 TB the whole statistic costs
    one text scan plus one word-keyed exchange.
    """
    docs = load_spread(spark, sf_dir, "documents")
    tok = docs.select(
        "lang",
        F.explode(
            F.filter(F.split(F.lower("text"), " "), lambda w: w != "")
        ).alias("word"),
    )
    vocab = (
        tok.groupBy("word")
        .agg(F.count(F.lit(1)).alias("c"))
        .orderBy(F.desc("c"), "word")
        .limit(VOCAB_TOP_N)
        .select("word", F.lit(1).alias("in_vocab"))
    )
    oov_flag = F.when(F.col("in_vocab").isNull(), 1).otherwise(0)
    return (
        tok.join(F.broadcast(vocab), "word", "left")
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("total_tokens"),
            F.sum(oov_flag.cast("long")).alias("oov_tokens"),
        )
        .select(
            "lang",
            "total_tokens",
            "oov_tokens",
            F.round(
                F.col("oov_tokens").cast("double") / F.col("total_tokens"), 6
            ).alias("oov_rate"),
        )
        .orderBy("lang")
    )
