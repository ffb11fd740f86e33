"""In-database ML: classifier training/evaluation and distribution fits
executed entirely as relational plans — no UDFs, no driver-side math.

The reference's pipeline ends at "store the documents"
(``scripts/spiders/web_spider_oo.py:283-308``); a training-data platform
additionally needs model-shaped quality signals computed IN the engine:
a supervised classifier over the corpus metadata (label noise detection,
weak supervision), a Zipf fit (corpus naturalness check — scraped spam
and boilerplate deviate from Zipf), and embedding-distribution drift
monitoring between an incoming batch and the corpus (the alarm that
triggers re-curation).  All three follow the repo's engine-exact
discipline (docs/DRIVER_CONTRACT.md): integer counts, DECIMAL
accumulation, ``ROUND(x, 6)`` at every double emission, ties broken by
explicit secondary keys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..checkpointing import materialize
from ..functions.numerics import dsum
from ..registry import register
from ..sources.tables import load, load_spread
from .clustering import DIM
from .clustering import BATCH_MOD

# ---------------------------------------------------------------------------
# Multinomial Naive Bayes: train on the corpus, evaluate on the corpus,
# emit the confusion matrix (the label-noise / separability profile).
# ---------------------------------------------------------------------------

_NB_ORACLE = """
WITH toks AS (
  SELECT doc_id, lang,
         unnest(list_filter(string_split(lower(text), ' '), w -> w <> '')) AS word
  FROM documents
),
tf AS (SELECT doc_id, lang AS true_lang, word, COUNT(*) AS tf
       FROM toks GROUP BY doc_id, lang, word),
wl AS (SELECT word, lang, COUNT(*) AS cwl FROM toks GROUP BY word, lang),
cl AS (SELECT lang, COUNT(*) AS cl FROM toks GROUP BY lang),
v AS (SELECT COUNT(DISTINCT word) AS v FROM toks),
nd AS (SELECT lang, COUNT(DISTINCT doc_id) AS nd FROM toks GROUP BY lang),
nt AS (SELECT COUNT(DISTINCT doc_id) AS nt FROM toks),
langs AS (
  SELECT cl.lang AS cand_lang, cl.cl, v.v, nd.nd, nt.nt,
         ROUND(ln(CAST(nd.nd AS DOUBLE) / nt.nt), 6) AS logprior,
         ROUND(ln(CAST(1 AS DOUBLE) / (cl.cl + v.v)), 6) AS default_logp
  FROM cl CROSS JOIN v JOIN nd ON nd.lang = cl.lang CROSS JOIN nt
),
scored AS (
  SELECT t.doc_id, t.true_lang, l.cand_lang,
         ROUND(
           MAX(l.logprior)
           + CAST(SUM(CAST(t.tf * COALESCE(
                 ROUND(ln(CAST(wl.cwl + 1 AS DOUBLE) / (l.cl + l.v)), 6),
                 l.default_logp) AS DECIMAL(18,6))) AS DOUBLE),
           6) AS score
  FROM tf t
  CROSS JOIN langs l
  LEFT JOIN wl ON wl.word = t.word AND wl.lang = l.cand_lang
  GROUP BY t.doc_id, t.true_lang, l.cand_lang
),
pred AS (
  SELECT doc_id, true_lang, cand_lang AS pred_lang
  FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
                                     ORDER BY score DESC, cand_lang) AS rk
        FROM scored) t
  WHERE rk = 1
)
SELECT true_lang, pred_lang, COUNT(*) AS n_docs
FROM pred GROUP BY true_lang, pred_lang
"""


@register("naive_bayes_lang_confusion", oracle=_NB_ORACLE)
def naive_bayes_lang_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multinomial Naive Bayes trained in-engine on (word, lang) counts
    with Laplace smoothing, applied back to every document; emits the
    confusion matrix.  High-confusion cells localize label noise — the
    weak-supervision quality gate a curation pipeline runs before
    training on metadata labels.

    Engine-exactness: counts are integers; every ``ln`` is rounded to 6
    on both engines before use; per-document scores accumulate the
    integer-tf × rounded-logp products in DECIMAL (order-free), so the
    argmax compares identical doubles and ties break on the language
    name.

    Plan at 100 TB: one token scan feeds the tf / (word,lang) / totals
    aggregates (all map-side combined); the model — |langs| priors plus
    per-language totals — broadcasts; scoring is one equi-join of the
    doc-term table against (word,lang) stats, shuffled on the word key
    (bounded by corpus vocabulary, never N²); the argmax is a per-doc
    window."""
    # the raw token explosion is ~3x the input and is consumed six times;
    # instead of re-scanning (or worse, checkpointing the blowup), collapse
    # it ONCE into the doc-term table and derive every model statistic from
    # that — tf is the smallest table all six consumers can share
    toks = (
        load_spread(spark, sf_dir, "documents")
        .select(
            "doc_id",
            "lang",
            F.explode(F.split(F.lower("text"), " ")).alias("word"),
        )
        .filter(F.col("word") != "")
    )
    tf = materialize(
        toks.groupBy("doc_id", F.col("lang").alias("true_lang"), "word").agg(
            F.count(F.lit(1)).alias("tf")
        )
    )
    wl = tf.groupBy("word", F.col("true_lang").alias("lang")).agg(
        F.sum("tf").alias("cwl")
    )
    cl = tf.groupBy(F.col("true_lang").alias("lang")).agg(F.sum("tf").alias("cl"))
    v = tf.agg(F.countDistinct("word").alias("v"))
    nd = tf.groupBy(F.col("true_lang").alias("lang")).agg(
        F.countDistinct("doc_id").alias("nd")
    )
    nt = tf.agg(F.countDistinct("doc_id").alias("nt"))
    langs = (
        cl.crossJoin(F.broadcast(v))
        .join(nd, "lang")
        .crossJoin(F.broadcast(nt))
        .select(
            F.col("lang").alias("cand_lang"),
            "cl",
            "v",
            F.round(F.log(F.col("nd").cast("double") / F.col("nt")), 6).alias(
                "logprior"
            ),
            F.round(F.log(F.lit(1.0) / (F.col("cl") + F.col("v"))), 6).alias(
                "default_logp"
            ),
        )
    )
    seen_logp = F.round(
        F.log((F.col("cwl") + 1).cast("double") / (F.col("cl") + F.col("v"))), 6
    )
    scored = (
        tf.crossJoin(F.broadcast(langs))
        .join(
            wl.select("word", F.col("lang").alias("cand_lang"), "cwl"),
            ["word", "cand_lang"],
            "left",
        )
        .select(
            "doc_id",
            "true_lang",
            "cand_lang",
            "logprior",
            (F.col("tf") * F.coalesce(seen_logp, F.col("default_logp"))).alias("term"),
        )
        .groupBy("doc_id", "true_lang", "cand_lang")
        .agg(F.round(F.max("logprior") + dsum(F.col("term")), 6).alias("score"))
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("score"), F.asc("cand_lang"))
    pred = (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select("true_lang", F.col("cand_lang").alias("pred_lang"))
    )
    return pred.groupBy("true_lang", "pred_lang").agg(
        F.count(F.lit(1)).alias("n_docs")
    )


# ---------------------------------------------------------------------------
# Zipf rank-frequency fit (corpus naturalness)
# ---------------------------------------------------------------------------

ZIPF_TOP_N = 500

_ZIPF_ORACLE = f"""
WITH wc AS (
  SELECT word, COUNT(*) AS n
  FROM (SELECT unnest(list_filter(string_split(lower(text), ' '), w -> w <> '')) AS word
        FROM documents)
  GROUP BY word
),
top AS (SELECT word, n FROM wc ORDER BY n DESC, word LIMIT {ZIPF_TOP_N}),
pts AS (
  SELECT ROUND(ln(CAST(ROW_NUMBER() OVER (ORDER BY n DESC, word) AS DOUBLE)), 6) AS x,
         ROUND(ln(CAST(n AS DOUBLE)), 6) AS y
  FROM top
),
sums AS (
  SELECT COUNT(*) AS n,
         ROUND(CAST(SUM(CAST(x AS DECIMAL(18,6))) AS DOUBLE), 6) AS sx,
         ROUND(CAST(SUM(CAST(y AS DECIMAL(18,6))) AS DOUBLE), 6) AS sy,
         ROUND(CAST(SUM(CAST(x * y AS DECIMAL(28,6))) AS DOUBLE), 6) AS sxy,
         ROUND(CAST(SUM(CAST(x * x AS DECIMAL(28,6))) AS DOUBLE), 6) AS sxx,
         ROUND(CAST(SUM(CAST(y * y AS DECIMAL(28,6))) AS DOUBLE), 6) AS syy
  FROM pts
)
SELECT n AS n_words, slope,
       ROUND(sy / n - slope * sx / n, 6) AS intercept,
       ROUND((n * sxy - sx * sy) * (n * sxy - sx * sy)
             / ((n * sxx - sx * sx) * (n * syy - sy * sy)), 6) AS r2
FROM (SELECT *, ROUND((n * sxy - sx * sy) / (n * sxx - sx * sx), 6) AS slope
      FROM sums) t
"""


@register("zipf_fit_words", oracle=_ZIPF_ORACLE)
def zipf_fit_words(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf's-law fit over the corpus vocabulary: least-squares slope of
    ln(frequency) on ln(rank) for the top-{ZIPF_TOP_N} words, plus R².
    Natural language sits near slope −1 with high R²; machine-generated
    spam, boilerplate floods, and encoding garbage bend the curve — a
    one-row corpus health check curation pipelines run per ingest batch.

    Engine-exactness: the OLS follows ols_trend_by_priority's discipline
    — DECIMAL moment sums, slope rounded to 6 BEFORE the intercept
    formula reuses it (sub-round ulps amplify through n·x̄).

    Plan: word count (map-side combined) → TakeOrderedAndProject keeps
    {ZIPF_TOP_N} rows → the rank window and regression run on a
    constant-size set, so the global ORDER BY costs nothing at any
    corpus size."""
    wc = (
        load_spread(spark, sf_dir, "documents")
        .select(F.explode(F.split(F.lower("text"), " ")).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    top = wc.orderBy(F.desc("n"), F.asc("word")).limit(ZIPF_TOP_N)
    rk = F.row_number().over(Window.orderBy(F.desc("n"), F.asc("word")))
    pts = top.select(
        F.round(F.log(rk.cast("double")), 6).alias("x"),
        F.round(F.log(F.col("n").cast("double")), 6).alias("y"),
    )
    sums = pts.agg(
        F.count(F.lit(1)).alias("n"),
        F.round(dsum(F.col("x")), 6).alias("sx"),
        F.round(dsum(F.col("y")), 6).alias("sy"),
        F.round(
            F.sum((F.col("x") * F.col("y")).cast("decimal(28,6)")).cast("double"), 6
        ).alias("sxy"),
        F.round(
            F.sum((F.col("x") * F.col("x")).cast("decimal(28,6)")).cast("double"), 6
        ).alias("sxx"),
        F.round(
            F.sum((F.col("y") * F.col("y")).cast("decimal(28,6)")).cast("double"), 6
        ).alias("syy"),
    )
    slope = F.round(
        (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy"))
        / (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")),
        6,
    )
    r2 = F.round(
        (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy"))
        * (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy"))
        / (
            (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx"))
            * (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy"))
        ),
        6,
    )
    return sums.select(
        F.col("n").alias("n_words"),
        slope.alias("slope"),
        F.round(
            F.col("sy") / F.col("n") - slope * F.col("sx") / F.col("n"), 6
        ).alias("intercept"),
        r2.alias("r2"),
    )


# ---------------------------------------------------------------------------
# Embedding-distribution drift: incoming batch vs corpus, per label
# ---------------------------------------------------------------------------

_DRIFT_ORACLE = f"""
WITH vecs AS (
  SELECT vec_id, label,
         CASE WHEN vec_id % {BATCH_MOD} = 0 THEN 'batch' ELSE 'corpus' END AS side,
         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb
  FROM embeddings
),
cent AS (
  SELECT label, side, i,
         ROUND(CAST(SUM(CAST(emb[i] AS DECIMAL(18,12))) AS DOUBLE) / COUNT(*), 6) AS c
  FROM vecs CROSS JOIN generate_series(1, {DIM}) t(i)
  GROUP BY label, side, i
),
counts AS (
  SELECT label,
         CAST(SUM(CASE WHEN side = 'corpus' THEN 1 ELSE 0 END) AS BIGINT) AS n_corpus,
         CAST(SUM(CASE WHEN side = 'batch' THEN 1 ELSE 0 END) AS BIGINT) AS n_batch
  FROM vecs GROUP BY label
)
SELECT counts.label, n_corpus, n_batch,
       ROUND(sqrt(CAST(SUM(CAST((a.c - b.c) * (a.c - b.c) AS DECIMAL(28,12)))
                       AS DOUBLE)), 6) AS l2_drift
FROM cent a
JOIN cent b ON a.label = b.label AND a.i = b.i
           AND a.side = 'corpus' AND b.side = 'batch'
JOIN counts ON counts.label = a.label
GROUP BY counts.label, n_corpus, n_batch
"""


@register("embedding_drift_by_label", oracle=_DRIFT_ORACLE)
def embedding_drift_by_label(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution-drift monitor for embeddings: L2 distance between the
    per-label centroid of the incoming batch (vec_id % {BATCH_MOD} == 0,
    the same split as incremental_semantic_dedup) and of the standing
    corpus.  A drifting label means the upstream embedding model or the
    data mix changed — the alarm that triggers re-curation before the
    batch contaminates training.

    Engine-exactness: per-dimension means accumulate in DECIMAL and round
    to 6; the squared-difference sum accumulates the products of those
    identical doubles in DECIMAL; sqrt is IEEE-correctly-rounded in both
    engines.

    Plan: one posexplode scan → (label, side, dim) means (map-side
    combined, ≤ |labels|·2·{DIM} rows out); the drift join runs on that
    metadata-sized table.  Nothing but the first aggregate ever sees the
    full vector table."""
    vecs = load_spread(spark, sf_dir, "embeddings").select(
        "vec_id",
        "label",
        F.when(F.col("vec_id") % BATCH_MOD == 0, "batch")
        .otherwise("corpus")
        .alias("side"),
        F.transform("embedding", lambda x: x.cast("double")).alias("emb"),
    )
    cent = (
        vecs.select("label", "side", F.posexplode("emb").alias("i", "x"))
        .groupBy("label", "side", "i")
        .agg(
            F.round(
                F.sum(F.col("x").cast("decimal(18,12)")).cast("double")
                / F.count(F.lit(1)),
                6,
            ).alias("c")
        )
    )
    counts = vecs.groupBy("label").agg(
        F.sum(F.when(F.col("side") == "corpus", 1).otherwise(0)).alias("n_corpus"),
        F.sum(F.when(F.col("side") == "batch", 1).otherwise(0)).alias("n_batch"),
    )
    a = cent.filter(F.col("side") == "corpus").select(
        "label", "i", F.col("c").alias("ca")
    )
    b = cent.filter(F.col("side") == "batch").select(
        "label", "i", F.col("c").alias("cb")
    )
    return (
        a.join(b, ["label", "i"])
        .groupBy("label")
        .agg(
            F.round(
                F.sqrt(
                    F.sum(
                        ((F.col("ca") - F.col("cb")) * (F.col("ca") - F.col("cb")))
                        .cast("decimal(28,12)")
                    ).cast("double")
                ),
                6,
            ).alias("l2_drift")
        )
        .join(counts, "label")
        .select("label", "n_corpus", "n_batch", "l2_drift")
    )


# ---------------------------------------------------------------------------
# Market-basket association rules (frequent brand pairs)
# ---------------------------------------------------------------------------
ASSOC_TOP = 20


@register(
    "assoc_rules_brands",
    oracle=f"""
WITH baskets AS (
  SELECT DISTINCT l.l_orderkey AS okey, p.p_brand AS brand
  FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
),
n AS (SELECT COUNT(DISTINCT okey) AS n_orders FROM baskets),
items AS (SELECT brand, COUNT(*) AS cnt FROM baskets GROUP BY brand),
pairs AS (
  SELECT a.brand AS brand_a, b.brand AS brand_b, COUNT(*) AS n_ab
  FROM baskets a JOIN baskets b
    ON a.okey = b.okey AND a.brand < b.brand
  GROUP BY brand_a, brand_b
)
SELECT p.brand_a, p.brand_b, CAST(p.n_ab AS BIGINT) AS n_ab,
       ROUND(CAST(p.n_ab AS DOUBLE) / n.n_orders, 6) AS support,
       ROUND(CAST(p.n_ab AS DOUBLE) / ia.cnt, 6) AS confidence,
       ROUND(CAST(p.n_ab AS DOUBLE) * n.n_orders
             / (CAST(ia.cnt AS DOUBLE) * ib.cnt), 6) AS lift
FROM pairs p
JOIN items ia ON ia.brand = p.brand_a
JOIN items ib ON ib.brand = p.brand_b
CROSS JOIN n
ORDER BY lift DESC, brand_a, brand_b
LIMIT {ASSOC_TOP}
""",
)
def assoc_rules_brands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Association rules over order baskets: which part brands are
    bought together more than chance (support / confidence / lift for
    brand pairs within an order) — the in-database market-basket /
    co-occurrence miner, the relational sibling of word_pmi_pairs.

    All three metrics are exact integer ratios (pair count, item counts,
    basket count), so the ranking is engine-exact.

    Plan at 100 TB: the basket build is one broadcast join against the
    (small) part dim + a distinct keyed on (order, brand); the pair
    self-join is keyed on the ORDER KEY, so its cost is Σ basket_size²
    — bounded by the per-order line cap, never corpus-quadratic — and
    the rule table lives in brand²-space (tiny).  Top-k is
    TakeOrderedAndProject."""
    li = load_spread(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    part = load(spark, sf_dir, "part").select("p_partkey", "p_brand")
    baskets = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .select(F.col("l_orderkey").alias("okey"), F.col("p_brand").alias("brand"))
        .distinct()
    )
    baskets = materialize(baskets)
    n = F.broadcast(baskets.agg(F.countDistinct("okey").alias("n_orders")))
    items = baskets.groupBy("brand").agg(F.count(F.lit(1)).alias("cnt"))
    a = baskets.alias("a")
    b = baskets.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.okey") == F.col("b.okey"))
            & (F.col("a.brand") < F.col("b.brand")),
        )
        .groupBy(
            F.col("a.brand").alias("brand_a"), F.col("b.brand").alias("brand_b")
        )
        .agg(F.count(F.lit(1)).alias("n_ab"))
    )
    ia = F.broadcast(items.select(F.col("brand").alias("brand_a"), F.col("cnt").alias("cnt_a")))
    ib = F.broadcast(items.select(F.col("brand").alias("brand_b"), F.col("cnt").alias("cnt_b")))
    return (
        pairs.join(ia, "brand_a")
        .join(ib, "brand_b")
        .crossJoin(n)
        .select(
            "brand_a",
            "brand_b",
            F.col("n_ab").alias("n_ab"),
            F.round(F.col("n_ab").cast("double") / F.col("n_orders"), 6).alias(
                "support"
            ),
            F.round(F.col("n_ab").cast("double") / F.col("cnt_a"), 6).alias(
                "confidence"
            ),
            F.round(
                F.col("n_ab").cast("double")
                * F.col("n_orders")
                / (F.col("cnt_a").cast("double") * F.col("cnt_b")),
                6,
            ).alias("lift"),
        )
        .orderBy(F.desc("lift"), "brand_a", "brand_b")
        .limit(ASSOC_TOP)
    )


# ---------------------------------------------------------------------------
# In-database logistic regression (unrolled gradient descent)
# ---------------------------------------------------------------------------
LOGIT_ROUNDS = 3
LOGIT_LR = 1.0  # learning rate (literal, engine-exact)
PRICE_SCALE = 100_000  # o_totalprice / 100k keeps z in a well-behaved range


def _logit_cte_parts(where: str = "", prefix: str = "") -> list[str]:
    # Discipline for the one transcendental (exp): z rounds to 3 decimals
    # BEFORE the sigmoid, p rounds to 6 after — a 1-ulp libm-vs-JVM exp
    # difference on the same z survives the 6dp round only at a
    # .5e-6 boundary of the true value, and gradient terms round to 6
    # before the DECIMAL sum, so weights stay bit-identical per round.
    #
    # ``where`` restricts the training rows (e.g. an md5-hex split for the
    # RHO-loss train/holdout pair); ``prefix`` namespaces every CTE so two
    # independent GD chains can live in one oracle.  Defaults preserve the
    # original names, so the logistic_regression_gd and el2n oracles are
    # byte-identical to the pre-parameterized version.
    q = prefix
    wc = f"\n  WHERE {where}" if where else ""
    feats = f"""f{q} AS (
  SELECT CASE WHEN o_orderstatus = 'F' THEN 1.0 ELSE 0.0 END AS y,
         1.0 AS x0,
         ROUND(o_totalprice / {PRICE_SCALE}.0, 6) AS x1,
         CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1.0 ELSE 0.0 END AS x2
  FROM orders{wc}
),
n{q} AS (SELECT COUNT(*) AS n_rows FROM f{q}),
w{q}0 AS (SELECT 0.0 AS w0, 0.0 AS w1, 0.0 AS w2)"""
    parts = [feats]
    prev = f"w{q}0"
    for r in range(1, LOGIT_ROUNDS + 1):
        parts.append(f"""p{q}{r} AS (
  SELECT y, x0, x1, x2,
         ROUND(1.0 / (1.0 + exp(-ROUND(w.w0 * x0 + w.w1 * x1 + w.w2 * x2, 3))), 6) AS p
  FROM f{q} CROSS JOIN {prev} w
),
g{q}{r} AS (
  SELECT CAST(SUM(CAST(ROUND((p - y) * x0, 6) AS DECIMAL(18,6))) AS DOUBLE) AS g0,
         CAST(SUM(CAST(ROUND((p - y) * x1, 6) AS DECIMAL(18,6))) AS DOUBLE) AS g1,
         CAST(SUM(CAST(ROUND((p - y) * x2, 6) AS DECIMAL(18,6))) AS DOUBLE) AS g2
  FROM p{q}{r}
),
w{q}{r} AS (
  SELECT ROUND(w.w0 - {LOGIT_LR} * g.g0 / n{q}.n_rows, 6) AS w0,
         ROUND(w.w1 - {LOGIT_LR} * g.g1 / n{q}.n_rows, 6) AS w1,
         ROUND(w.w2 - {LOGIT_LR} * g.g2 / n{q}.n_rows, 6) AS w2
  FROM {prev} w CROSS JOIN g{q}{r} g CROSS JOIN n{q}
)""")
        prev = f"w{q}{r}"
    return parts


def _logit_oracle() -> str:
    parts = _logit_cte_parts()
    prev = f"w{LOGIT_ROUNDS}"
    acc = f"""acc AS (
  SELECT CAST(SUM(CASE WHEN (CASE WHEN ROUND(1.0 / (1.0 + exp(-ROUND(w.w0 * x0 + w.w1 * x1 + w.w2 * x2, 3))), 6) >= 0.5
                                  THEN 1.0 ELSE 0.0 END) = y THEN 1 ELSE 0 END) AS BIGINT) AS n_correct,
         CAST(COUNT(*) AS BIGINT) AS n_rows
  FROM f CROSS JOIN {prev} w
)"""
    parts.append(acc)
    unions = "\nUNION ALL\n".join(
        f"SELECT {r} AS round, w0, w1, w2, NULL::BIGINT AS n_correct, NULL::BIGINT AS n_rows FROM w{r}"
        for r in range(1, LOGIT_ROUNDS + 1)
    )
    return (
        "WITH " + ",\n".join(parts)
        + f"""
SELECT * FROM ({unions}
UNION ALL
SELECT {LOGIT_ROUNDS + 1} AS round, w.w0, w.w1, w.w2, a.n_correct, a.n_rows
FROM w{LOGIT_ROUNDS} w CROSS JOIN acc a)"""
    )


def _logit_features(
    spark: SparkSession, sf_dir: str, side: str | None = None
) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    if side is not None:
        orders = orders.filter(_split_col(side))
    return orders.select(
        F.when(F.col("o_orderstatus") == "F", 1.0).otherwise(0.0).alias("y"),
        F.lit(1.0).alias("x0"),
        F.round(F.col("o_totalprice") / float(PRICE_SCALE), 6).alias("x1"),
        F.when(
            F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1.0
        ).otherwise(0.0).alias("x2"),
    )


# Deterministic 75/25 train/holdout split on the md5 hex of the order key
# (hex digits 0-9a-b = 12/16 of the space train, c-f holdout) — the same
# md5-hex split device as split_leakage_audit, so both engines agree
# row-for-row with no randomness.
SPLIT_SQL = {
    "train": "substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 1) < 'c'",
    "holdout": "substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 1) >= 'c'",
}


def _split_col(side: str):
    nib = F.substring(F.md5(F.col("o_orderkey").cast("string")), 1, 1)
    return nib < "c" if side == "train" else nib >= "c"


_TRAIN_CACHE: dict[str, list[list[float]]] = {}


def _orders_fingerprint(sf_dir: str) -> str:
    """Cache-invalidation key so a rewritten fixture (e.g. a test reusing
    a tmp dir within one process) retrains instead of silently reusing
    stale weights (advice r8)."""
    from ..sources.tables import table_fingerprint

    return table_fingerprint(sf_dir, "orders")


def train_logistic(spark: SparkSession, sf_dir: str) -> list[list[float]]:
    """The {LOGIT_ROUNDS}-round GD loop, returning the per-round rounded
    weights (last entry = final model) — shared by logistic_regression_gd
    and the streaming scorer so the two can never drift.

    The history is memoized per sf_dir (the model-registry pattern: train
    once, score everywhere).  Safe because the rounded weights are a pure
    deterministic function of the orders table at that path — four
    operators consume this model, and without the cache each paid the
    full {LOGIT_ROUNDS}-round training cost per query."""
    key = f"{sf_dir}|{_orders_fingerprint(sf_dir)}"
    cached = _TRAIN_CACHE.get(key)
    if cached is not None:
        return [list(w) for w in cached]
    history = _run_gd(spark, materialize(_logit_features(spark, sf_dir)))
    _TRAIN_CACHE[key] = [list(w) for w in history]
    return history


def train_logistic_split(
    spark: SparkSession, sf_dir: str, side: str
) -> list[list[float]]:
    """GD training restricted to one side of the md5-hex order-key split
    (``SPLIT_SQL``) — the train-model / irreducible-loss-model pair the
    RHO-loss selector needs.  Memoized per (sf_dir, side) like
    train_logistic; weights follow the identical round-before-reuse
    discipline, so the oracle's prefixed CTE chain reproduces them
    bit-for-bit."""
    key = f"{sf_dir}|{side}|{_orders_fingerprint(sf_dir)}"
    cached = _TRAIN_CACHE.get(key)
    if cached is not None:
        return [list(w) for w in cached]
    f = materialize(_logit_features(spark, sf_dir, side=side))
    history = _run_gd(spark, f)
    _TRAIN_CACHE[key] = [list(w) for w in history]
    return history


def _run_gd(spark: SparkSession, f: DataFrame) -> list[list[float]]:
    """One map-side-combinable aggregate job per GD round — nothing else.

    Optimization r13 (guide §1.2): the old loop ran THREE kinds of job —
    an up-front count(), the per-round gradient aggregate, and a
    per-round ``spark.range(1).select(F.round(...))`` whose only purpose
    was JVM half-up rounding of three driver floats.  The row count now
    rides the FIRST gradient aggregate (one extra count column in the
    same map-side-combined pass), and the weight rounding uses
    :func:`..functions.numerics.round_half_up`, documented (and
    regression-tested) bit-identical to routing the literal through
    ``F.round`` — LOGIT_ROUNDS+1 fewer driver barriers per training,
    identical weights."""
    from ..functions.numerics import round_half_up

    n_rows: int | None = None
    w = [0.0, 0.0, 0.0]
    history = []
    for r in range(LOGIT_ROUNDS):
        z = F.round(
            F.lit(w[0]) * F.col("x0")
            + F.lit(w[1]) * F.col("x1")
            + F.lit(w[2]) * F.col("x2"),
            3,
        )
        p = F.round(1.0 / (1.0 + F.exp(-z)), 6)
        count_cols = [F.count(F.lit(1)).alias("n_rows")] if n_rows is None else []
        g = f.select(
            *[
                F.round((p - F.col("y")) * F.col(f"x{j}"), 6).alias(f"t{j}")
                for j in range(3)
            ]
        ).agg(
            *[dsum(F.col(f"t{j}")).alias(f"g{j}") for j in range(3)],
            *count_cols,
        ).collect()[0]
        if n_rows is None:
            n_rows = g["n_rows"]
        w = [round_half_up(w[j] - LOGIT_LR * g[f"g{j}"] / n_rows, 6) for j in range(3)]
        history.append(list(w))
    return history


@register("logistic_regression_gd", oracle=_logit_oracle())
def logistic_regression_gd(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Logistic regression trained IN the engine: {LOGIT_ROUNDS} unrolled
    full-batch gradient-descent rounds predicting order finality
    (o_orderstatus = 'F') from scaled price and an urgency flag, plus a
    final training-accuracy row — the in-database-ML pattern where the
    model never leaves the warehouse and each round is one aggregate.

    Cross-engine exactness for the one transcendental: z rounds to 3
    BEFORE exp, p to 6 after, per-row gradient terms to 6 before the
    DECIMAL sum, weights to 6 per round (the round-before-reuse
    discipline) — both engines carry bit-identical weights into the next
    round.  Weights per round come back as O(1) driver scalars (the
    kmeans-inertia pattern) and re-enter the plan as literals.

    Plan at 100 TB: each round is ONE map-side-combinable aggregate over
    the feature scan (3 decimal sums), no shuffle of the data, weights
    broadcast as literals — exactly how distributed full-batch GD/L-BFGS
    outer loops are built."""
    history = train_logistic(spark, sf_dir)
    f = materialize(_logit_features(spark, sf_dir))
    out = [
        (r + 1, w[0], w[1], w[2], None, None) for r, w in enumerate(history)
    ]
    w = history[-1]
    z = F.round(
        F.lit(w[0]) * F.col("x0")
        + F.lit(w[1]) * F.col("x1")
        + F.lit(w[2]) * F.col("x2"),
        3,
    )
    p = F.round(1.0 / (1.0 + F.exp(-z)), 6)
    pred = F.when(p >= 0.5, 1.0).otherwise(0.0)
    accrow = f.agg(
        F.sum(F.when(pred == F.col("y"), 1).otherwise(0)).cast("bigint").alias("nc"),
        F.count(F.lit(1)).alias("n"),
    ).collect()[0]
    out.append((LOGIT_ROUNDS + 1, w[0], w[1], w[2], accrow["nc"], accrow["n"]))
    return spark.createDataFrame(
        out, "round int, w0 double, w1 double, w2 double, n_correct long, n_rows long"
    )


# ---------------------------------------------------------------------------
# Decision-stump split finder (histogram-based, per-feature best Gini)
# ---------------------------------------------------------------------------
@register(
    "gini_best_split",
    oracle="""
WITH f AS (
  SELECT CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS y,
         CAST(ROUND(l_quantity) AS INT) AS qty,
         CAST(ROUND(l_discount * 100) AS INT) AS disc
  FROM lineitem
),
long AS (
  SELECT 'quantity' AS feature, qty AS val, y FROM f
  UNION ALL
  SELECT 'discount_pct' AS feature, disc AS val, y FROM f
),
hist AS (
  SELECT feature, val, COUNT(*) AS n, SUM(y) AS npos
  FROM long GROUP BY feature, val
),
cum AS (
  SELECT feature, val,
         SUM(n) OVER (PARTITION BY feature ORDER BY val) AS nl,
         SUM(npos) OVER (PARTITION BY feature ORDER BY val) AS pl,
         SUM(n) OVER (PARTITION BY feature) AS nt,
         SUM(npos) OVER (PARTITION BY feature) AS pt,
         MAX(val) OVER (PARTITION BY feature) AS vmax
  FROM hist
),
splits AS (
  SELECT feature, val AS threshold,
         CAST(nl AS BIGINT) AS n_left, CAST(nt - nl AS BIGINT) AS n_right,
         ROUND(
           (nl * (1.0 - power(CAST(pl AS DOUBLE) / nl, 2)
                      - power(1.0 - CAST(pl AS DOUBLE) / nl, 2))
            + (nt - nl) * (1.0 - power(CAST(pt - pl AS DOUBLE) / (nt - nl), 2)
                               - power(1.0 - CAST(pt - pl AS DOUBLE) / (nt - nl), 2)))
           / nt, 6) AS gini_split
  FROM cum WHERE val < vmax
)
SELECT feature, threshold, n_left, n_right, gini_split
FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY feature
                                   ORDER BY gini_split, threshold) AS rk
      FROM splits) t
WHERE rk = 1
""",
)
def gini_best_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decision-stump split finder over lineitem (label: returned flag),
    the histogram-based algorithm every distributed tree learner
    (XGBoost/LightGBM-style) uses: collapse the fact table to per-
    (feature, value) class counts, then scan thresholds via a window
    cumsum over that tiny histogram — never sorting the raw rows.
    Weighted Gini impurity from pure-integer counts; the split with the
    lowest impurity wins per feature (ties to the smaller threshold).

    Plan at 100 TB: one map-side-combinable histogram aggregation per
    fact scan; everything after operates on |distinct values| rows.
    This is THE reason histogram tree learners scale — the split search
    is O(V), not O(N log N)."""
    li = load(spark, sf_dir, "lineitem")
    f = li.select(
        F.when(F.col("l_returnflag") == "R", 1).otherwise(0).alias("y"),
        F.round(F.col("l_quantity")).cast("int").alias("qty"),
        F.round(F.col("l_discount") * 100).cast("int").alias("disc"),
    )
    long = f.select(F.lit("quantity").alias("feature"), F.col("qty").alias("val"), "y").unionAll(
        f.select(F.lit("discount_pct").alias("feature"), F.col("disc").alias("val"), "y")
    )
    hist = long.groupBy("feature", "val").agg(
        F.count(F.lit(1)).alias("n"), F.sum("y").alias("npos")
    )
    wc = Window.partitionBy("feature").orderBy("val")
    wt = Window.partitionBy("feature")
    cum = hist.select(
        "feature",
        "val",
        F.sum("n").over(wc).alias("nl"),
        F.sum("npos").over(wc).alias("pl"),
        F.sum("n").over(wt).alias("nt"),
        F.sum("npos").over(wt).alias("pt"),
        F.max("val").over(wt).alias("vmax"),
    )
    pl_rate = F.col("pl").cast("double") / F.col("nl")
    pr_rate = (F.col("pt") - F.col("pl")).cast("double") / (F.col("nt") - F.col("nl"))
    gini = F.round(
        (
            F.col("nl") * (1.0 - F.pow(pl_rate, 2) - F.pow(1.0 - pl_rate, 2))
            + (F.col("nt") - F.col("nl"))
            * (1.0 - F.pow(pr_rate, 2) - F.pow(1.0 - pr_rate, 2))
        )
        / F.col("nt"),
        6,
    )
    splits = cum.filter(F.col("val") < F.col("vmax")).select(
        "feature",
        F.col("val").alias("threshold"),
        F.col("nl").cast("bigint").alias("n_left"),
        (F.col("nt") - F.col("nl")).cast("bigint").alias("n_right"),
        gini.alias("gini_split"),
    )
    wr = Window.partitionBy("feature").orderBy("gini_split", "threshold")
    return (
        splits.withColumn("rk", F.row_number().over(wr))
        .filter(F.col("rk") == 1)
        .select("feature", "threshold", "n_left", "n_right", "gini_split")
    )
