"""Corpus profiling and weighting operators: TF-IDF term scoring, numeric
histograms, single-pass column profiles, and stratified deterministic
sampling.

The reference pipeline stores crawled text and defers all analysis
(``/root/reference/README.md:2``); these are the data-profiling steps a
training-data pipeline runs over that store before filtering decisions.
Everything is pure Catalyst — explode / groupBy / window / one-pass
aggregates — with the shuffle structure called out per operator.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..checkpointing import materialize
from ..functions.numerics import davg, dsum, oracle_dsum
from ..registry import register
from ..sources.tables import load, load_spread

_HEX = "0123456789abcdef"
_ORACLE_NIBBLE = f"(strpos('{_HEX}', substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1)"

_WORDS_SQL = (
    "SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents"
)


# ---------------------------------------------------------------------------
# TF-IDF: the canonical corpus term-weighting pipeline
# ---------------------------------------------------------------------------
@register(
    "tfidf_top_terms",
    oracle=f"""
WITH words AS (SELECT * FROM ({_WORDS_SQL}) w WHERE word <> ''),
tf AS (SELECT doc_id, word, COUNT(*) AS tf FROM words GROUP BY doc_id, word),
dfreq AS (SELECT word, COUNT(DISTINCT doc_id) AS df FROM words GROUP BY word),
n AS (SELECT COUNT(*) AS n_docs FROM documents),
scored AS (
  SELECT tf.doc_id, tf.word, tf.tf,
         ROUND(ln(CAST(n_docs AS DOUBLE) / df), 6) AS idf
  FROM tf JOIN dfreq USING (word) CROSS JOIN n
)
SELECT doc_id, word, tf, ROUND(tf * idf, 6) AS tfidf
FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
                                   ORDER BY tf * idf DESC, word) AS rk
      FROM scored) s
WHERE rk <= 3
""",
)
def tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 TF-IDF terms per document — the classic term-weighting
    pipeline (term frequency × inverse document frequency).

    Plan shape: one explode, then two aggregations over the same exploded
    frame — per-(doc, word) term counts and per-word document frequencies
    — joined back on word, ranked per doc.  Both aggs combine map-side
    before their shuffles, and the corpus size joins in as a broadcast
    one-row aggregate.  At 100 TB the word join is the wide operation;
    its key space is the vocabulary, which AQE re-splits if skewed (stop
    words are exactly the skewed keys).  IDF is rounded to 6 decimals
    *before* the tf×idf product on both engines, so last-ulp ``ln``
    differences can't reorder the ranking.
    """
    docs = load(spark, sf_dir, "documents")
    words = (
        docs.select("doc_id", F.explode(F.split("text", " ")).alias("word"))
        .filter(F.col("word") != "")
    )
    tf = words.groupBy("doc_id", "word").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = words.groupBy("word").agg(F.count_distinct("doc_id").alias("df"))
    n = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    scored = (
        tf.join(dfreq, "word")
        .crossJoin(F.broadcast(n))
        .withColumn(
            "idf", F.round(F.log(F.col("n_docs").cast("double") / F.col("df")), 6)
        )
    )
    w = Window.partitionBy("doc_id").orderBy(
        (F.col("tf") * F.col("idf")).desc(), "word"
    )
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .select("doc_id", "word", "tf", F.round(F.col("tf") * F.col("idf"), 6).alias("tfidf"))
    )


# ---------------------------------------------------------------------------
# Fixed-width numeric histogram
# ---------------------------------------------------------------------------
@register(
    "histogram_extendedprice",
    oracle=f"""
SELECT CAST(FLOOR(l_extendedprice / 5000) AS BIGINT) * 5000 AS bin_start,
       COUNT(*) AS n,
       {oracle_dsum('l_extendedprice')} AS bin_revenue
FROM lineitem
GROUP BY 1
ORDER BY bin_start
""",
)
def histogram_extendedprice(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width histogram of line-item prices (bin width 5000) — the
    distribution-profiling primitive behind skew detection and outlier
    caps.

    Scale: the bin id is a pure projection, so this is a single partial+
    final hash aggregate on ~dozens of groups; shuffle volume is the bin
    count per task regardless of input size.
    """
    li = load(spark, sf_dir, "lineitem")
    return (
        li.groupBy(
            (F.floor(F.col("l_extendedprice") / 5000).cast("long") * 5000).alias(
                "bin_start"
            )
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            dsum(F.col("l_extendedprice")).alias("bin_revenue"),
        )
        .orderBy("bin_start")
    )


# ---------------------------------------------------------------------------
# Single-pass column profile (ANALYZE-style)
# ---------------------------------------------------------------------------
@register(
    "profile_orders_columns",
    oracle="""
SELECT 'o_custkey' AS column_name, COUNT(*) AS n_rows,
       COUNT(*) - COUNT(o_custkey) AS n_nulls,
       COUNT(DISTINCT o_custkey) AS n_distinct,
       CAST(MIN(o_custkey) AS DOUBLE) AS min_num,
       CAST(MAX(o_custkey) AS DOUBLE) AS max_num
FROM orders
UNION ALL
SELECT 'o_orderpriority', COUNT(*), COUNT(*) - COUNT(o_orderpriority),
       COUNT(DISTINCT o_orderpriority), NULL, NULL
FROM orders
UNION ALL
SELECT 'o_orderstatus', COUNT(*), COUNT(*) - COUNT(o_orderstatus),
       COUNT(DISTINCT o_orderstatus), NULL, NULL
FROM orders
UNION ALL
SELECT 'o_totalprice', COUNT(*), COUNT(*) - COUNT(o_totalprice),
       COUNT(DISTINCT o_totalprice), MIN(o_totalprice), MAX(o_totalprice)
FROM orders
ORDER BY column_name
""",
)
def profile_orders_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANALYZE-style column profile (rows / nulls / distinct / min / max
    for four orders columns) computed in ONE scan.

    The oracle reads the table four times for clarity; the Spark plan
    computes all sixteen aggregates in a single pass and unpivots the
    one-row result with ``stack`` — at 100 TB the difference is 4 scans
    vs 1.  The multiple exact COUNT(DISTINCT)s expand the input (one
    replica per distinct aggregate), which is the documented cost of
    exactness; swap in approx_count_distinct when ±2 % is acceptable.
    """
    orders = load(spark, sf_dir, "orders")
    one = orders.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count("o_custkey").alias("nn_custkey"),
        F.count_distinct("o_custkey").alias("nd_custkey"),
        F.min("o_custkey").cast("double").alias("min_custkey"),
        F.max("o_custkey").cast("double").alias("max_custkey"),
        F.count("o_orderpriority").alias("nn_priority"),
        F.count_distinct("o_orderpriority").alias("nd_priority"),
        F.count("o_orderstatus").alias("nn_status"),
        F.count_distinct("o_orderstatus").alias("nd_status"),
        F.count("o_totalprice").alias("nn_totalprice"),
        F.count_distinct("o_totalprice").alias("nd_totalprice"),
        F.min("o_totalprice").alias("min_totalprice"),
        F.max("o_totalprice").alias("max_totalprice"),
    )
    return (
        one.select(
            F.expr(
                """stack(4,
                  'o_custkey',      n_rows, n_rows - nn_custkey,    nd_custkey,    min_custkey,           max_custkey,
                  'o_orderpriority',n_rows, n_rows - nn_priority,   nd_priority,   CAST(NULL AS DOUBLE),  CAST(NULL AS DOUBLE),
                  'o_orderstatus',  n_rows, n_rows - nn_status,     nd_status,     CAST(NULL AS DOUBLE),  CAST(NULL AS DOUBLE),
                  'o_totalprice',   n_rows, n_rows - nn_totalprice, nd_totalprice, min_totalprice,        max_totalprice
                ) AS (column_name, n_rows, n_nulls, n_distinct, min_num, max_num)"""
            )
        )
        .orderBy("column_name")
    )


# ---------------------------------------------------------------------------
# Malformed-input robustness (PERMISSIVE JSON parsing)
# ---------------------------------------------------------------------------
@register(
    "json_parse_robustness",
    oracle="""
WITH base AS (
  SELECT props FROM events WHERE props IS NOT NULL
  UNION ALL
  SELECT * FROM (VALUES ('{broken'), ('not json at all'), ('{"k": 42}')) v(props)
)
SELECT COUNT(*) AS n_total,
       CAST(SUM(CASE WHEN json_valid(props) THEN 1 ELSE 0 END) AS BIGINT) AS n_valid,
       CAST(SUM(CASE WHEN json_valid(props) THEN 0 ELSE 1 END) AS BIGINT) AS n_corrupt,
       CAST(SUM(CASE WHEN json_valid(props)
                 AND json_extract_string(props, 'k') IS NOT NULL
                THEN 1 ELSE 0 END) AS BIGINT) AS n_with_k
FROM base
""",
)
def json_parse_robustness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Malformed-record accounting: PERMISSIVE ``from_json`` turns corrupt
    inputs into NULL structs instead of failing the job — the ingest
    contract any 100 TB pipeline needs (a handful of bad rows must never
    kill a stage).  The fixture's props are all well-formed, so two
    known-bad literals are unioned in to prove the corrupt path; the
    oracle classifies the same rows with ``json_valid``.
    """
    # NULL props are excluded on BOTH sides: Spark's from_json(NULL) yields a
    # null struct (counted valid) while DuckDB's json_valid(NULL) is NULL
    # (counted corrupt) — the contract here is "classify non-null strings".
    ev = (
        load(spark, sf_dir, "events")
        .select("props")
        .filter(F.col("props").isNotNull())
    )
    bad = spark.createDataFrame(
        [("{broken",), ("not json at all",), ('{"k": 42}',)], "props string"
    )
    base = ev.unionByName(bad)
    # PERMISSIVE parsing yields an all-null struct for corrupt input; the
    # explicit _corrupt_record column is what actually flags it.
    parsed = F.from_json(
        "props",
        "k INT, _corrupt_record STRING",
        {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": "_corrupt_record"},
    )
    corrupt = F.col("p._corrupt_record").isNotNull()
    return base.select(parsed.alias("p")).agg(
        F.count(F.lit(1)).alias("n_total"),
        F.sum(F.when(~corrupt, 1).otherwise(0)).alias("n_valid"),
        F.sum(F.when(corrupt, 1).otherwise(0)).alias("n_corrupt"),
        F.sum(F.when(F.col("p.k").isNotNull(), 1).otherwise(0)).alias("n_with_k"),
    )


# ---------------------------------------------------------------------------
# Sketch-based percentiles
# ---------------------------------------------------------------------------
_APPROX_PS = [0.25, 0.5, 0.75, 0.95]
_APPROX_ACCURACY = 10000
# bound the sketch by exact quantiles at p ± this rank slack: 100x the
# sketch's guaranteed 1/accuracy rank error, so the contract holds under
# any partitioning / merge order while still being a real bound
_RANK_SLACK = 0.01


def approx_quantiles_by_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Raw sketch quantiles per priority (used by the bounded-contract
    query below and by the error-bound pytest)."""
    return (
        load(spark, sf_dir, "orders")
        .groupBy("o_orderpriority")
        .agg(
            F.percentile_approx(
                "o_totalprice", _APPROX_PS, _APPROX_ACCURACY
            ).alias("approx_quantiles"),
            F.count(F.lit(1)).alias("n_orders"),
        )
        .orderBy("o_orderpriority")
    )


@register(
    "approx_percentile_prices",
    oracle="""
SELECT o_orderpriority,
       COUNT(*) AS n_orders,
       ROUND(quantile_cont(o_totalprice, 0.5), 6) AS exact_p50,
       TRUE AS within_bound
FROM orders GROUP BY o_orderpriority
""",
)
def approx_percentile_prices(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate percentiles of order totals per priority via the
    percentile_approx sketch (accuracy 10000) — the single-pass,
    fixed-memory companion to the exact percentile_quantiles: sketches
    merge associatively across partitions, so at 100 TB this costs one
    map-side sketch per task + a tiny merge, versus the exact
    operator's full sort.

    Bounded-contract oracle: the sketch's values are engine-specific, so
    the emitted columns are the exact median (percentile ≡ DuckDB
    quantile_cont, both linearly interpolated) plus ``within_bound`` —
    TRUE iff every sketch quantile lies between the exact quantiles at
    p ± 1% rank slack (the sketch guarantees 0.01%).  The oracle states
    the contract as a literal TRUE; a sketch regression flips the Spark
    side to FALSE and fails the value hash.  The tighter empirical bound
    is asserted in tests/test_profiling_windows.py."""
    orders = load(spark, sf_dir, "orders")
    lo_ps = F.array(*[F.lit(max(p - _RANK_SLACK, 0.0)) for p in _APPROX_PS])
    hi_ps = F.array(*[F.lit(min(p + _RANK_SLACK, 1.0)) for p in _APPROX_PS])
    agg = orders.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.percentile_approx("o_totalprice", _APPROX_PS, _APPROX_ACCURACY).alias("ap"),
        F.percentile("o_totalprice", lo_ps).alias("lo"),
        F.percentile("o_totalprice", hi_ps).alias("hi"),
        F.round(F.percentile("o_totalprice", F.lit(0.5)), 6).alias("exact_p50"),
    )
    within = F.lit(True)
    for i in range(len(_APPROX_PS)):
        within = within & (F.col("ap")[i] >= F.col("lo")[i]) & (
            F.col("ap")[i] <= F.col("hi")[i]
        )
    return agg.select(
        "o_orderpriority", "n_orders", "exact_p50", within.alias("within_bound")
    )


# ---------------------------------------------------------------------------
# Bigram language-model scoring
# ---------------------------------------------------------------------------
@register(
    "bigram_lm_doc_score",
    oracle="""
WITH toks AS (
  SELECT doc_id, list_filter(string_split(text, ' '), w -> w <> '') AS t
  FROM documents
),
big AS (
  SELECT doc_id, unnest(t[1:len(t)-1]) AS w1, unnest(t[2:len(t)]) AS w2
  FROM toks WHERE len(t) >= 2
),
c2 AS (SELECT w1, w2, COUNT(*) AS n2 FROM big GROUP BY w1, w2),
c1 AS (SELECT w1, COUNT(*) AS n1 FROM big GROUP BY w1),
scored AS (
  SELECT big.doc_id,
         ROUND(ln(CAST(n2 AS DOUBLE) / n1), 6) AS logp
  FROM big JOIN c2 USING (w1, w2) JOIN c1 USING (w1)
)
SELECT doc_id, COUNT(*) AS n_bigrams,
       ROUND(CAST(SUM(CAST(logp AS DECIMAL(18,12))) AS DOUBLE) / COUNT(*), 6)
         AS avg_logprob
FROM scored GROUP BY doc_id
""",
)
def bigram_lm_doc_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bigram language-model fluency score: train corpus bigram
    probabilities P(w2|w1) = C(w1,w2)/C(w1·), then score each document by
    its mean log-probability — the model-based quality signal (a cheap
    stand-in for perplexity filtering) next to the rule-based
    quality_score.

    Plan shape: one explode into bigram instances feeds the two count
    aggregations AND the scoring join (all partial-aggregated before
    their shuffles); both count tables are vocabulary-sized, joined on
    their natural keys.  Per-bigram log-probs round to 6 decimals before
    the DECIMAL mean, so ``ln`` last-ulp differences can't leak into the
    result.  At 100 TB: identical shape to TF-IDF — AQE handles the
    stop-bigram skew.
    """
    docs = load(spark, sf_dir, "documents")
    toks = F.filter(F.split("text", " "), lambda w: w != "")
    big = (
        docs.select("doc_id", toks.alias("t"))
        .filter(F.size("t") >= 2)
        .select(
            "doc_id",
            F.explode(
                F.zip_with(
                    F.slice("t", 1, F.size("t") - 1),
                    F.slice("t", 2, F.size("t") - 1),
                    lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
                )
            ).alias("bg"),
        )
        .select("doc_id", "bg.w1", "bg.w2")
    )
    c2 = big.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("n2"))
    c1 = big.groupBy("w1").agg(F.count(F.lit(1)).alias("n1"))
    logp = F.round(F.log(F.col("n2").cast("double") / F.col("n1")), 6)
    return (
        big.join(c2, ["w1", "w2"])
        .join(c1, ["w1"])
        .select("doc_id", logp.alias("logp"))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.round(
                F.sum(F.col("logp").cast("decimal(18,12)")).cast("double")
                / F.count(F.lit(1)),
                6,
            ).alias("avg_logprob"),
        )
    )


# ---------------------------------------------------------------------------
# Stratified deterministic sampling
# ---------------------------------------------------------------------------
@register(
    "stratified_sample_docs",
    oracle=f"""
SELECT doc_id, lang, source, n_chars
FROM documents
WHERE {_ORACLE_NIBBLE} < 4
""",
)
def stratified_sample_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic ~25 % document sample (md5 nibble of doc_id < 4) —
    the reproducible downsampling step before expensive per-doc work.

    Content-independent and partition-independent: the same row lands in
    the sample on any cluster layout, any run — unlike ``df.sample``,
    whose output depends on partitioning.  The predicate is a pure
    projection (no shuffle); at 100 TB this is a map-only 4× data cut.
    Uniform hashing keeps per-language proportions (the strata) intact
    in expectation without a per-stratum pass.
    """
    docs = load(spark, sf_dir, "documents")
    nibble = (
        F.instr(F.lit(_HEX), F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1))
        - 1
    )
    return docs.filter(nibble < 4).select("doc_id", "lang", "source", "n_chars")


SAMPLE_K = 10  # rows kept per (lang) group


@register(
    "exact_k_per_group_sample",
    oracle=f"""
WITH hashed AS (
  SELECT doc_id, lang, source, n_chars,
         md5('samp|' || CAST(doc_id AS VARCHAR)) AS h
  FROM documents
),
ranked AS (
  SELECT doc_id, lang, source, n_chars,
         ROW_NUMBER() OVER (PARTITION BY lang ORDER BY h, doc_id) AS rk
  FROM hashed
)
SELECT doc_id, lang, source, n_chars FROM ranked WHERE rk <= {SAMPLE_K}
""",
)
def exact_k_per_group_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exactly-{k} rows per language, chosen by hash order — the
    deterministic eval-set builder (rate-based sampling like
    stratified_sample_docs cannot guarantee a per-group count; ranking a
    salted hash can).  Reproducible on any partitioning, and uniform
    within each group because md5 order is content-blind.

    Plan: ONE shuffle on the group key + in-partition rank — the
    windowed-topk shape; per-group state is the k-row head, so skewed
    groups cost their sort, not memory."""
    docs = load(spark, sf_dir, "documents")
    h = F.md5(F.concat(F.lit("samp|"), F.col("doc_id").cast("string")))
    w = Window.partitionBy("lang").orderBy("h", "doc_id")
    return (
        docs.select("doc_id", "lang", "source", "n_chars", h.alias("h"))
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= SAMPLE_K)
        .select("doc_id", "lang", "source", "n_chars")
    )


@register(
    "mad_outlier_orders",
    oracle="""
WITH med AS (
  SELECT o_orderpriority AS p,
         ROUND(CAST(median(o_totalprice) AS DOUBLE), 6) AS med
  FROM orders GROUP BY o_orderpriority
),
dev AS (
  SELECT o.o_orderpriority AS p, m.med,
         ABS(o.o_totalprice - m.med) AS d
  FROM orders o JOIN med m ON m.p = o.o_orderpriority
),
mad AS (SELECT p, ROUND(CAST(median(d) AS DOUBLE), 6) AS mad FROM dev GROUP BY p)
SELECT dev.p AS o_orderpriority,
       ANY_VALUE(dev.med) AS med_price,
       ANY_VALUE(mad.mad) AS mad_price,
       COUNT(*) AS n_orders,
       CAST(SUM(CASE WHEN dev.d > 3 * 1.4826 * mad.mad THEN 1 ELSE 0 END)
            AS BIGINT) AS n_outliers
FROM dev JOIN mad ON mad.p = dev.p
GROUP BY dev.p
""",
)
def mad_outlier_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust outlier detection by median absolute deviation: per order
    priority, median price, MAD, and the count of orders beyond
    3·1.4826·MAD — the robust complement of timeseries.anomaly_zscore
    (a z-score baseline is itself dragged by the outliers it hunts; the
    median/MAD pair is not).  Medians are exact (parity proven by
    percentile_quantiles) and rounded to 6 before the deviation pass so
    both engines threshold identical values.

    Plan: two grouped exact medians (each buffers one group's values) +
    two broadcast joins of the |groups|-row stats — the scan is spread
    (load_spread) so median buffering parallelizes."""
    o = load_spread(spark, sf_dir, "orders").select("o_orderpriority", "o_totalprice")
    med = o.groupBy("o_orderpriority").agg(
        F.round(F.median("o_totalprice"), 6).alias("med")
    )
    dev = o.join(F.broadcast(med), "o_orderpriority").select(
        "o_orderpriority",
        "med",
        F.abs(F.col("o_totalprice") - F.col("med")).alias("d"),
    )
    mad = dev.groupBy("o_orderpriority").agg(F.round(F.median("d"), 6).alias("mad"))
    return (
        dev.join(F.broadcast(mad), "o_orderpriority")
        .groupBy("o_orderpriority")
        .agg(
            F.first("med").alias("med_price"),
            F.first("mad").alias("mad_price"),
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(
                F.when(F.col("d") > 3 * 1.4826 * F.col("mad"), 1).otherwise(0)
            ).cast("long").alias("n_outliers"),
        )
    )


@register(
    "ols_trend_by_priority",
    oracle="""
WITH monthly AS (
  SELECT o_orderpriority AS p,
         CAST(date_part('year', o_orderdate) * 12 + date_part('month', o_orderdate)
              AS BIGINT) AS x,
         ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE), 6) AS y
  FROM orders GROUP BY o_orderpriority, x
),
sums AS (
  SELECT p, COUNT(*) AS n,
         CAST(SUM(x) AS DOUBLE) AS sx,
         ROUND(CAST(SUM(CAST(y AS DECIMAL(18,6))) AS DOUBLE), 6) AS sy,
         ROUND(CAST(SUM(CAST(x * y AS DECIMAL(28,6))) AS DOUBLE), 6) AS sxy,
         CAST(SUM(x * x) AS DOUBLE) AS sxx
  FROM monthly GROUP BY p
)
SELECT p AS o_orderpriority, n AS n_months, slope,
       ROUND(sy / n - slope * sx / n, 6) AS intercept
FROM (SELECT *, ROUND((n * sxy - sx * sy) / (n * sxx - sx * sx), 6) AS slope
      FROM sums) t
""",
)
def ols_trend_by_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group least-squares trend: monthly revenue per order priority
    regressed on the month index — the in-database ML primitive behind
    every trend forecast.  All sums accumulate in DECIMAL (exact,
    order-free); slope/intercept are computed by the identical double
    formula in both engines and rounded to 6 — engine-exact regression
    without a single UDF.

    Plan: two grouped aggregates (monthly rollup, then the 5 regression
    sums) — the second is |priorities|×|months| rows in, |priorities|
    out; nothing bigger than the monthly table ever shuffles."""
    o = load(spark, sf_dir, "orders")
    x = (F.year("o_orderdate") * 12 + F.month("o_orderdate")).cast("bigint")
    monthly = o.groupBy(
        F.col("o_orderpriority").alias("p"), x.alias("x")
    ).agg(F.round(dsum(F.col("o_totalprice")), 6).alias("y"))
    sums = monthly.groupBy("p").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").cast("double").alias("sx"),
        F.round(dsum(F.col("y")), 6).alias("sy"),
        F.round(
            F.sum((F.col("x") * F.col("y")).cast("decimal(28,6)")).cast("double"), 6
        ).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast("double").alias("sxx"),
    )
    # slope is ROUNDED before the intercept uses it: sub-round-6 slope
    # ulps would otherwise be amplified by sx (~n·x̄) into visible
    # intercept divergence across engines
    slope = F.round(
        (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy"))
        / (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")),
        6,
    )
    return sums.select(
        F.col("p").alias("o_orderpriority"),
        F.col("n").alias("n_months"),
        slope.alias("slope"),
        F.round(
            F.col("sy") / F.col("n") - slope * F.col("sx") / F.col("n"), 6
        ).alias("intercept"),
    )


_CORR_COLS = ("l_quantity", "l_extendedprice", "l_discount", "l_tax")


def _corr_pairs():
    cols = _CORR_COLS
    return [(cols[i], cols[j]) for i in range(len(cols)) for j in range(i + 1, len(cols))]


_ORACLE_CORR = " UNION ALL ".join(
    f"""SELECT '{a}' AS col_a, '{b}' AS col_b,
       ROUND((n * sxy - sx * sy)
             / (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy)), 6) AS pearson_r
FROM (SELECT COUNT(*) AS n,
             ROUND(CAST(SUM(CAST({a} AS DECIMAL(18,6))) AS DOUBLE), 6) AS sx,
             ROUND(CAST(SUM(CAST({b} AS DECIMAL(18,6))) AS DOUBLE), 6) AS sy,
             ROUND(CAST(SUM(CAST({a} * {b} AS DECIMAL(28,6))) AS DOUBLE), 6) AS sxy,
             ROUND(CAST(SUM(CAST({a} * {a} AS DECIMAL(28,6))) AS DOUBLE), 6) AS sxx,
             ROUND(CAST(SUM(CAST({b} * {b} AS DECIMAL(28,6))) AS DOUBLE), 6) AS syy
      FROM lineitem) t"""
    for a, b in _corr_pairs()
)


@register("corr_matrix_lineitem", oracle=_ORACLE_CORR)
def corr_matrix_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise Pearson correlations between the lineitem measures — the
    column-correlation profile an optimizer or feature-selection pass
    computes.  One scan computes ALL moment sums (every pair's n/sx/sy/
    sxy/sxx/syy in a single aggregate); correlations are the identical
    double formula both sides, rounded to 6.

    Plan: ONE pass over lineitem, one map-side-combined aggregate row;
    the |pairs| output rows are driver-free projections of that row."""
    li = load(spark, sf_dir, "lineitem")
    aggs = [F.count(F.lit(1)).alias("n")]
    for c in _CORR_COLS:
        aggs.append(F.round(dsum(F.col(c)), 6).alias(f"s_{c}"))
        aggs.append(
            F.round(
                F.sum((F.col(c) * F.col(c)).cast("decimal(28,6)")).cast("double"), 6
            ).alias(f"ss_{c}")
        )
    for a, b in _corr_pairs():
        aggs.append(
            F.round(
                F.sum((F.col(a) * F.col(b)).cast("decimal(28,6)")).cast("double"), 6
            ).alias(f"sp_{a}_{b}")
        )
    one = li.agg(*aggs)
    # Optimization r13 (guide §2.4/§3.3): the old shape union'd one
    # .select() per pair over `one`, replicating the whole
    # scan+aggregate subtree |pairs| times in the plan (6 scans of
    # lineitem at sf0.1 unless exchange reuse fired).  Exploding an
    # array of per-pair structs over the SINGLE one-row aggregate keeps
    # exactly one scan + one aggregate; the per-pair arithmetic is the
    # identical double formula, so values are unchanged.
    pair_structs = []
    for a, b in _corr_pairs():
        r = (
            F.col("n") * F.col(f"sp_{a}_{b}") - F.col(f"s_{a}") * F.col(f"s_{b}")
        ) / (
            F.sqrt(F.col("n") * F.col(f"ss_{a}") - F.col(f"s_{a}") * F.col(f"s_{a}"))
            * F.sqrt(F.col("n") * F.col(f"ss_{b}") - F.col(f"s_{b}") * F.col(f"s_{b}"))
        )
        pair_structs.append(
            F.struct(
                F.lit(a).alias("col_a"),
                F.lit(b).alias("col_b"),
                F.round(r, 6).alias("pearson_r"),
            )
        )
    return one.select(F.explode(F.array(*pair_structs)).alias("p")).select(
        "p.col_a", "p.col_b", "p.pearson_r"
    )


@register(
    "ab_test_lift",
    oracle="""
WITH assign AS (
  SELECT DISTINCT user_id,
         CASE WHEN (strpos('0123456789abcdef',
                    substr(md5('ab|' || CAST(user_id AS VARCHAR)), 1, 1)) - 1) < 8
              THEN 'A' ELSE 'B' END AS arm
  FROM events
),
conv AS (
  SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase'
),
arms AS (
  SELECT a.arm, COUNT(*) AS n_users,
         CAST(SUM(CASE WHEN c.user_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
           AS n_converted
  FROM assign a LEFT JOIN conv c USING (user_id)
  GROUP BY a.arm
)
SELECT arm, n_users, n_converted,
       ROUND(CAST(n_converted AS DOUBLE) / n_users, 6) AS conv_rate
FROM arms
""",
)
def ab_test_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A/B experiment readout: users deterministically hash-assigned to
    arms (md5 nibble — the same stable-bucketing discipline as
    train_test_split_stats, so assignment is reproducible on any engine
    and never leaks across sessions), conversion = ever purchased,
    per-arm size and conversion rate.

    Plan: the assignment is a map-side expression on the distinct-user
    roll; one user-keyed join against the converter set; a |arms|-row
    aggregate.  The experimentation shape on event logs."""
    ev = load(spark, sf_dir, "events")
    nibble = (
        F.instr(
            F.lit("0123456789abcdef"),
            F.substring(F.md5(F.concat(F.lit("ab|"), F.col("user_id").cast("string"))), 1, 1),
        )
        - 1
    )
    assign = ev.select("user_id").distinct().select(
        "user_id", F.when(nibble < 8, "A").otherwise("B").alias("arm")
    )
    conv = ev.filter(F.col("event_type") == "purchase").select("user_id").distinct()
    arms = (
        assign.join(conv.withColumn("c", F.lit(1)), "user_id", "left")
        .groupBy("arm")
        .agg(
            F.count(F.lit(1)).alias("n_users"),
            F.sum(F.coalesce("c", F.lit(0))).cast("long").alias("n_converted"),
        )
    )
    return arms.select(
        "arm",
        "n_users",
        "n_converted",
        F.round(F.col("n_converted").cast("double") / F.col("n_users"), 6).alias(
            "conv_rate"
        ),
    )


@register(
    "chi2_lang_source",
    oracle="""
WITH obs AS (SELECT lang, source, COUNT(*) AS o FROM documents GROUP BY lang, source),
rt AS (SELECT lang, SUM(o) AS rl FROM obs GROUP BY lang),
ct AS (SELECT source, SUM(o) AS cs FROM obs GROUP BY source),
n AS (SELECT SUM(o) AS n FROM obs),
cells AS (
  SELECT o.lang, o.source, o.o,
         ROUND(CAST(rt.rl AS DOUBLE) * ct.cs / n.n, 6) AS e
  FROM obs o JOIN rt USING (lang) JOIN ct USING (source) CROSS JOIN n
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_cells,
       ROUND(CAST(SUM(CAST(ROUND((o - e) * (o - e) / e, 6) AS DECIMAL(18,6)))
                  AS DOUBLE), 6) AS chi2
FROM cells
""",
)
def chi2_lang_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-square independence statistic for the lang × source
    contingency table — the categorical counterpart of the Pearson
    matrix (is language mix independent of source?).  Expected counts
    and per-cell terms are rounded before the DECIMAL sum, so the
    statistic is engine-exact.

    Plan: one contingency aggregate; row/column margins are re-aggregates
    of the (tiny) cell table; everything after the first groupBy is
    metadata-sized."""
    docs = load(spark, sf_dir, "documents")
    obs = docs.groupBy("lang", "source").agg(F.count(F.lit(1)).alias("o"))
    rt = obs.groupBy("lang").agg(F.sum("o").alias("rl"))
    ct = obs.groupBy("source").agg(F.sum("o").alias("cs"))
    n = obs.agg(F.sum("o").alias("n"))
    cells = (
        obs.join(F.broadcast(rt), "lang")
        .join(F.broadcast(ct), "source")
        .crossJoin(F.broadcast(n))
        .select(
            "o",
            F.round(F.col("rl").cast("double") * F.col("cs") / F.col("n"), 6).alias("e"),
        )
    )
    term = F.round((F.col("o") - F.col("e")) * (F.col("o") - F.col("e")) / F.col("e"), 6)
    return cells.agg(
        F.count(F.lit(1)).cast("long").alias("n_cells"),
        F.round(dsum(term), 6).alias("chi2"),
    )


_DECILES = [i / 10 for i in range(1, 10)]


@register(
    "equidepth_histogram_prices",
    oracle=f"""
WITH b AS (
  SELECT list_transform(quantile_cont(o_totalprice, {_DECILES}),
                        q -> ROUND(CAST(q AS DOUBLE), 6)) AS bs
  FROM orders
)
SELECT CAST(len(list_filter(b.bs, q -> o.o_totalprice > q)) AS INT) AS bucket,
       COUNT(*) AS n,
       MIN(o.o_totalprice) AS min_price,
       MAX(o.o_totalprice) AS max_price
FROM orders o CROSS JOIN b
GROUP BY bucket
""",
)
def equidepth_histogram_prices(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-depth (decile) histogram of order prices — the data-skipping
    statistic equi-WIDTH histograms can't provide under skew.  The
    scalable shape: decile BOUNDARIES come from one exact-percentile
    aggregate (1 row, broadcast back), bucket assignment is a map-side
    comparison count — never the NTILE global sort that would funnel
    every row through one partition.  Boundaries are rounded to 6 before
    bucketing so both engines split ties identically.

    Plan: one percentile aggregate (spread scan) + broadcast 1-row join
    + a ≤10-group aggregate."""
    o = load_spread(spark, sf_dir, "orders").select("o_totalprice")
    bounds = o.agg(
        F.transform(
            F.percentile("o_totalprice", F.array(*[F.lit(q) for q in _DECILES])),
            lambda q: F.round(q, 6),
        ).alias("bs")
    )
    bucket = F.size(F.filter("bs", lambda b: F.col("o_totalprice") > b))
    return (
        o.crossJoin(F.broadcast(bounds))
        .groupBy(bucket.alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("o_totalprice").alias("min_price"),
            F.max("o_totalprice").alias("max_price"),
        )
    )


@register(
    "impute_value_by_type",
    oracle="""
WITH holed AS (
  SELECT event_type,
         CASE WHEN event_id % 13 = 0 THEN NULL ELSE value END AS value
  FROM events
),
means AS (
  SELECT event_type,
         ROUND(CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE)
               / COUNT(value), 6) AS fill_mean
  FROM holed GROUP BY event_type
)
SELECT h.event_type,
       COUNT(*) AS n_total,
       CAST(SUM(CASE WHEN h.value IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_imputed,
       ANY_VALUE(m.fill_mean) AS fill_mean,
       ROUND(CAST(SUM(CAST(COALESCE(h.value, m.fill_mean) AS DECIMAL(18,6)))
                  AS DOUBLE) / COUNT(*), 6) AS imputed_mean
FROM holed h JOIN means m USING (event_type)
GROUP BY h.event_type
""",
)
def impute_value_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mean imputation per group — the feature-engineering null-fill
    step: a planted hole pattern (every 13th event) is filled with the
    group's DECIMAL-exact mean of the surviving values; reports hole
    counts and the post-imputation mean.

    Plan: one grouped mean over the non-null subset (broadcast back) +
    one grouped rollup of the COALESCEd column — two passes, both
    map-side-combined; the fill itself is a broadcast-join projection."""
    ev = load(spark, sf_dir, "events")
    holed = ev.select(
        "event_type",
        F.when(F.col("event_id") % 13 == 0, F.lit(None)).otherwise(F.col("value")).alias("value"),
    )
    means = holed.groupBy("event_type").agg(
        F.round(dsum(F.col("value")) / F.count("value"), 6).alias("fill_mean")
    )
    return (
        holed.join(F.broadcast(means), "event_type")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_total"),
            F.sum(F.when(F.col("value").isNull(), 1).otherwise(0))
            .cast("long")
            .alias("n_imputed"),
            F.first("fill_mean").alias("fill_mean"),
            F.round(
                dsum(F.coalesce("value", "fill_mean")) / F.count(F.lit(1)), 6
            ).alias("imputed_mean"),
        )
    )


PMI_TOP = 20
PMI_MIN_SUPPORT = 20  # co-occurrence count floor


@register(
    "word_pmi_pairs",
    oracle=f"""
WITH dw AS (
  SELECT DISTINCT doc_id, w
  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents)
  WHERE w <> ''
),
n AS (SELECT COUNT(DISTINCT doc_id) AS nd FROM dw),
wf AS (SELECT w, COUNT(*) AS dfw FROM dw GROUP BY w),
pairs AS (
  SELECT a.w AS w_a, b.w AS w_b, COUNT(*) AS co
  FROM dw a JOIN dw b ON a.doc_id = b.doc_id AND a.w < b.w
  GROUP BY a.w, b.w
),
scored AS (
  SELECT p.w_a, p.w_b, p.co,
         ROUND(ROUND(ln(CAST(p.co AS DOUBLE) * n.nd
                        / (fa.dfw * CAST(fb.dfw AS DOUBLE))), 9), 6) AS pmi
  FROM pairs p
  JOIN wf fa ON fa.w = p.w_a
  JOIN wf fb ON fb.w = p.w_b
  CROSS JOIN n
  WHERE p.co >= {PMI_MIN_SUPPORT}
)
SELECT w_a, w_b, co, pmi FROM scored
ORDER BY pmi DESC, w_a, w_b LIMIT {PMI_TOP}
""",
)
def word_pmi_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collocation mining by pointwise mutual information: document-level
    co-occurrence counts vs independent document frequencies,
    PMI = ln(co·N / (df_a·df_b)), support-floored, top-{PMI_TOP}.  The
    phrase-discovery member of the text family (rounded-log discipline).

    Plan: per-doc distinct words, then the co-occurrence equi-join on
    doc_id (fan-out bounded by words-per-doc, the same guarantee as the
    graph co-occurrence build); df and N ride broadcasts;
    TakeOrderedAndProject for the top-k."""
    docs = load(spark, sf_dir, "documents")
    dw = (
        docs.select("doc_id", F.explode(F.split("text", " ")).alias("w"))
        .filter(F.col("w") != "")
        .distinct()
    )
    n = dw.agg(F.count_distinct("doc_id").alias("nd"))
    wf = dw.groupBy("w").agg(F.count(F.lit(1)).alias("dfw"))
    a = dw.select("doc_id", F.col("w").alias("w_a"))
    b = dw.select("doc_id", F.col("w").alias("w_b"))
    pairs = (
        a.join(b, "doc_id")
        .filter(F.col("w_a") < F.col("w_b"))
        .groupBy("w_a", "w_b")
        .agg(F.count(F.lit(1)).alias("co"))
        .filter(F.col("co") >= PMI_MIN_SUPPORT)
    )
    pmi = F.round(
        F.round(
            F.log(
                F.col("co").cast("double")
                * F.col("nd")
                / (F.col("dfw_a") * F.col("dfw_b").cast("double"))
            ),
            9,
        ),
        6,
    )
    return (
        pairs.join(F.broadcast(wf.select(F.col("w").alias("w_a"), F.col("dfw").alias("dfw_a"))), "w_a")
        .join(F.broadcast(wf.select(F.col("w").alias("w_b"), F.col("dfw").alias("dfw_b"))), "w_b")
        .crossJoin(F.broadcast(n))
        .select("w_a", "w_b", "co", pmi.alias("pmi"))
        .orderBy(F.col("pmi").desc(), "w_a", "w_b")
        .limit(PMI_TOP)
    )


@register(
    "ab_test_wilson_bounds",
    oracle="""
WITH assign AS (
  SELECT DISTINCT user_id,
         CASE WHEN (strpos('0123456789abcdef',
                    substr(md5('ab|' || CAST(user_id AS VARCHAR)), 1, 1)) - 1) < 8
              THEN 'A' ELSE 'B' END AS arm
  FROM events
),
conv AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase'),
arms AS (
  SELECT a.arm, COUNT(*) AS n,
         CAST(SUM(CASE WHEN c.user_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
           AS k
  FROM assign a LEFT JOIN conv c USING (user_id)
  GROUP BY a.arm
)
SELECT arm, n AS n_users, k AS n_converted,
       ROUND((CAST(k AS DOUBLE) / n + 1.9208 / n
              - 1.96 * sqrt((CAST(k AS DOUBLE) / n) * (1 - CAST(k AS DOUBLE) / n) / n
                            + 0.9604 / (n * CAST(n AS DOUBLE))))
             / (1 + 3.8416 / n), 6) AS wilson_low,
       ROUND((CAST(k AS DOUBLE) / n + 1.9208 / n
              + 1.96 * sqrt((CAST(k AS DOUBLE) / n) * (1 - CAST(k AS DOUBLE) / n) / n
                            + 0.9604 / (n * CAST(n AS DOUBLE))))
             / (1 + 3.8416 / n), 6) AS wilson_high
FROM arms
""",
)
def ab_test_wilson_bounds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A/B readout with uncertainty: per-arm Wilson 95% score interval on
    the conversion rate (z = 1.96; the interval that behaves at small n
    and extreme rates, unlike the normal approximation).  Pure
    arithmetic + one correctly-rounded sqrt, written identically in both
    engines and rounded to 6 — engine-exact inference without any
    stats-library dependency.

    Plan: identical to ab_test_lift (distinct-user roll + one user-keyed
    join); the bounds are projections of the |arms|-row aggregate."""
    ev = load(spark, sf_dir, "events")
    nibble = (
        F.instr(
            F.lit("0123456789abcdef"),
            F.substring(
                F.md5(F.concat(F.lit("ab|"), F.col("user_id").cast("string"))), 1, 1
            ),
        )
        - 1
    )
    assign = ev.select("user_id").distinct().select(
        "user_id", F.when(nibble < 8, "A").otherwise("B").alias("arm")
    )
    conv = ev.filter(F.col("event_type") == "purchase").select("user_id").distinct()
    arms = (
        assign.join(conv.withColumn("c", F.lit(1)), "user_id", "left")
        .groupBy("arm")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.coalesce("c", F.lit(0))).cast("long").alias("k"),
        )
    )
    p = F.col("k").cast("double") / F.col("n")
    halfw = 1.96 * F.sqrt(
        p * (1 - p) / F.col("n") + 0.9604 / (F.col("n") * F.col("n").cast("double"))
    )
    denom = 1 + 3.8416 / F.col("n")
    return arms.select(
        "arm",
        F.col("n").alias("n_users"),
        F.col("k").alias("n_converted"),
        F.round((p + 1.9208 / F.col("n") - halfw) / denom, 6).alias("wilson_low"),
        F.round((p + 1.9208 / F.col("n") + halfw) / denom, 6).alias("wilson_high"),
    )


# ---------------------------------------------------------------------------
# Deterministic weighted sampling (Efraimidis–Spirakis top-k)
# ---------------------------------------------------------------------------
WEIGHTED_SAMPLE_K = 50


@register(
    "weighted_sample_docs",
    oracle=f"""
WITH keyed AS (
  SELECT doc_id, lang, n_chars,
         -ln((CAST(CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)
                   AS BIGINT) AS DOUBLE) + 1) / 4294967296.0)
           / n_chars AS k
  FROM documents
)
SELECT doc_id, lang, n_chars, ROUND(k, 6) AS sample_key
FROM keyed
ORDER BY ROUND(k, 9), doc_id
LIMIT {WEIGHTED_SAMPLE_K}
""",
)
def weighted_sample_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted sampling without replacement (Efraimidis–Spirakis): each
    row gets key −ln(u)/w with u a DETERMINISTIC md5-derived uniform and
    w = n_chars; the k smallest keys are a weighted sample where longer
    documents are proportionally more likely — the distributed,
    reproducible answer to "sample 50 docs by length" that rate-based
    sampling cannot give (exact k) and rand()-based sampling cannot give
    (same rows on every run, every partitioning, every cluster).

    Plan at 100 TB: the key is a map-side projection; selection is
    TakeOrderedAndProject (per-partition top-k, tiny merge) — no global
    sort, no shuffle of non-winners."""
    docs = load(spark, sf_dir, "documents")
    h = F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10).cast(
        "double"
    )
    key = -F.log((h + 1) / F.lit(4294967296.0)) / F.col("n_chars")
    return (
        docs.select("doc_id", "lang", "n_chars", key.alias("k"))
        # top-k by the ROUNDED key (round-before-compare discipline): JVM
        # Math.log and libm ln can differ in the last ulp, so a near-tie at
        # the k-th boundary must not select different rows per engine.
        .orderBy(F.round("k", 9), "doc_id")
        .limit(WEIGHTED_SAMPLE_K)
        .select("doc_id", "lang", "n_chars", F.round("k", 6).alias("sample_key"))
    )


# ---------------------------------------------------------------------------
# Winsorized robust statistics: clamp at exact P05/P95 before averaging —
# the outlier-hardening step run before any metric feeds a dashboard/model.
# ---------------------------------------------------------------------------
WINSOR_LO, WINSOR_HI = 0.05, 0.95


@register(
    "winsorized_price_stats",
    oracle=f"""
WITH b AS (
  SELECT ROUND(CAST(quantile_cont(o_totalprice, {WINSOR_LO}) AS DOUBLE), 6) AS lo,
         ROUND(CAST(quantile_cont(o_totalprice, {WINSOR_HI}) AS DOUBLE), 6) AS hi
  FROM orders
)
SELECT o_orderpriority,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE)
             / COUNT(*), 6) AS raw_mean,
       ROUND(CAST(SUM(CAST(least(greatest(o_totalprice, b.lo), b.hi)
                           AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*), 6)
         AS wins_mean,
       CAST(SUM(CASE WHEN o_totalprice < b.lo THEN 1 ELSE 0 END) AS BIGINT)
         AS n_clamped_low,
       CAST(SUM(CASE WHEN o_totalprice > b.hi THEN 1 ELSE 0 END) AS BIGINT)
         AS n_clamped_high
FROM orders o CROSS JOIN b
GROUP BY o_orderpriority ORDER BY o_orderpriority
""",
)
def winsorized_price_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorized vs raw mean order price per priority: global exact
    P05/P95 boundaries (rounded to 6 BEFORE clamping — the derived-stat
    discipline, so both engines clamp the identical set), values clamped
    with least/greatest, DECIMAL-accumulated means, plus how many rows
    each tail clamped.

    Scale: same shape as equidepth_histogram_prices — ONE exact-
    percentile aggregate produces a 1-row boundary table that broadcasts
    back over the fact scan (never a global sort / NTILE), then a tiny
    5-group aggregate with map-side combine.
    """
    o = load_spread(spark, sf_dir, "orders").select("o_orderpriority", "o_totalprice")
    bounds = o.agg(
        F.round(F.percentile("o_totalprice", F.lit(WINSOR_LO)), 6).alias("lo"),
        F.round(F.percentile("o_totalprice", F.lit(WINSOR_HI)), 6).alias("hi"),
    )
    clamped = F.least(F.greatest(F.col("o_totalprice"), F.col("lo")), F.col("hi"))
    return (
        o.crossJoin(F.broadcast(bounds))
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(davg(F.col("o_totalprice")), 6).alias("raw_mean"),
            F.round(dsum(clamped) / F.count(F.lit(1)), 6).alias("wins_mean"),
            F.sum(F.when(F.col("o_totalprice") < F.col("lo"), 1).otherwise(0))
            .cast("long")
            .alias("n_clamped_low"),
            F.sum(F.when(F.col("o_totalprice") > F.col("hi"), 1).otherwise(0))
            .cast("long")
            .alias("n_clamped_high"),
        )
        .orderBy("o_orderpriority")
    )


# ---------------------------------------------------------------------------
# CCNet-style perplexity bucketing (Wenzek et al. 2020, "CCNet: Extracting
# High Quality Monolingual Datasets"): per-language head/middle/tail split
# by LM score terciles — the model-based curation gate next to the
# rule-based quality_percentile_filter.
# ---------------------------------------------------------------------------
_CCNET_Q1, _CCNET_Q2 = 1 / 3, 2 / 3


def _ccnet_oracle() -> str:
    from ..registry import get_spec

    lm = get_spec("bigram_lm_doc_score").oracle.strip()
    return f"""
WITH sd AS (
  SELECT s.doc_id, s.avg_logprob, d.lang
  FROM ({lm}) s JOIN documents d ON d.doc_id = s.doc_id
),
b AS (
  SELECT lang,
         ROUND(CAST(quantile_cont(avg_logprob, {_CCNET_Q1!r}) AS DOUBLE), 6) AS b1,
         ROUND(CAST(quantile_cont(avg_logprob, {_CCNET_Q2!r}) AS DOUBLE), 6) AS b2
  FROM sd GROUP BY lang
),
x AS (
  SELECT sd.lang,
         CASE WHEN sd.avg_logprob > b.b2 THEN 'head'
              WHEN sd.avg_logprob > b.b1 THEN 'middle'
              ELSE 'tail' END AS bucket,
         sd.avg_logprob
  FROM sd JOIN b ON b.lang = sd.lang
)
SELECT lang, bucket,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       ROUND(CAST(SUM(CAST(avg_logprob AS DECIMAL(18,6))) AS DOUBLE)
             / COUNT(*), 6) AS avg_logprob
FROM x GROUP BY lang, bucket ORDER BY lang, bucket
"""


@register("ccnet_perplexity_buckets", oracle=_ccnet_oracle())
def ccnet_perplexity_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style corpus split: score every document with the corpus
    bigram LM (``bigram_lm_doc_score`` reused verbatim), then bucket
    per language into head/middle/tail at the exact score terciles —
    head = most fluent third, the slice kept for pre-training.
    Boundaries are rounded to 6 BEFORE bucketing and per-document
    scores are already round-6, so both engines split ties identically.

    Scale: the LM scoring keeps its vocabulary-keyed shape; boundaries
    are one ≤n_langs-row exact-percentile aggregate broadcast back over
    the scored docs (never an NTILE global sort); the final aggregate
    is ≤ 3·n_langs groups.
    """
    from ..registry import get_spec

    scored = get_spec("bigram_lm_doc_score").fn(spark, sf_dir)
    docs = load(spark, sf_dir, "documents").select("doc_id", "lang")
    sd = scored.join(docs, "doc_id").select("lang", "avg_logprob")
    b = sd.groupBy("lang").agg(
        F.round(F.percentile("avg_logprob", F.lit(_CCNET_Q1)), 6).alias("b1"),
        F.round(F.percentile("avg_logprob", F.lit(_CCNET_Q2)), 6).alias("b2"),
    )
    bucket = (
        F.when(F.col("avg_logprob") > F.col("b2"), "head")
        .when(F.col("avg_logprob") > F.col("b1"), "middle")
        .otherwise("tail")
    )
    return (
        sd.join(F.broadcast(b), "lang")
        .select("lang", bucket.alias("bucket"), "avg_logprob")
        .groupBy("lang", "bucket")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.round(
                F.sum(F.col("avg_logprob").cast("decimal(18,6)")).cast("double")
                / F.count(F.lit(1)),
                6,
            ).alias("avg_logprob"),
        )
        .orderBy("lang", "bucket")
    )


# ---------------------------------------------------------------------------
# Poisson-bootstrap confidence interval (online bootstrap, one pass)
# ---------------------------------------------------------------------------
BOOT_REPLICAS = 32
# Poisson(1) inverse-CDF cut points (cumulative probabilities, 6dp
# literals so both engines compare against the identical constants).
_POIS_CUM = [0.367879, 0.735759, 0.919699, 0.981012, 0.996340, 0.999406,
             0.999917, 0.999990]
# Round-8 constant cut (r7 VERDICT ask #6): one md5 per (row, replica) was
# ~4.8M digests at sf0.1 and dominated the operator's 8.6 s wall.  A 128-bit
# md5 digest holds EIGHT independent 16-bit uniforms (the op only ever used
# 16 bits of each digest), so 4 digests per ROW — computed map-side BEFORE
# the x32 explode — cover all 32 replicas: replica b reads hex chars
# [(b%8)*4+1, +4) of digest b//8.  8x fewer hashes, same uniform resolution
# (1/65536), identical derivation in both engines.
_BOOT_DIGESTS = BOOT_REPLICAS // 8  # 8 x 16-bit uniforms per md5 digest
_BOOT_DIGS_SQL = "[" + ", ".join(
    f"md5('boot{j}|' || CAST(o_orderkey AS VARCHAR))" for j in range(_BOOT_DIGESTS)
) + "]"
# Second constant cut: fixed-width lowercase hex compares lexicographically
# in NUMERIC order ('0'..'9' < 'a'..'f' in ASCII), so `v/65536 < c` is
# exactly `hexslice < hex(ceil(c*65536))` — c*65536 is never an integer, so
# the integer thresholds preserve every comparison bit-for-bit.  This drops
# the per-(row, replica) hex->int conversion and float division; the hot
# loop is one substr + 8 string compares, identical in both engines.
# Width: the LAST cut point ceils to 65536 = 0x10000, which is FIVE hex
# chars — compared against a 4-char slice the lexicographic==numeric
# equivalence breaks ('fffb' < '10000' is false), silently making w=7
# unreachable.  Both sides therefore compare at fixed width 5: thresholds
# zero-pad to 5 chars and the 16-bit slice gets a leading '0'.
_POIS_HEX = [format(math.ceil(c * 65536), "05x") for c in _POIS_CUM]
assert all(c * 65536 != math.floor(c * 65536) for c in _POIS_CUM)
assert all(len(h) == 5 for h in _POIS_HEX)  # width overflow tripwire
_BOOT_SLICE = "'0' || substr(digs[b // 8 + 1], (b % 8) * 4 + 1, 4)"
_BOOT_W_SQL = "CASE " + " ".join(
    f"WHEN u < '{h}' THEN {k}" for k, h in enumerate(_POIS_HEX)
) + f" ELSE {len(_POIS_HEX)} END"


@register(
    "bootstrap_ci_order_value",
    oracle=f"""
WITH digs AS (
  SELECT o_orderkey, o_totalprice, {_BOOT_DIGS_SQL} AS digs FROM orders
),
reps AS (
  SELECT o_orderkey, o_totalprice, digs, CAST(r.range AS INT) AS b
  FROM digs, range({BOOT_REPLICAS}) r
),
weighted AS (
  SELECT b, o_totalprice AS x, {_BOOT_W_SQL} AS w
  FROM (SELECT o_orderkey, o_totalprice, b, {_BOOT_SLICE} AS u FROM reps) t
),
means AS (
  SELECT b,
         ROUND(CAST(SUM(CAST(ROUND(w * x, 6) AS DECIMAL(18,6))) AS DOUBLE)
               / SUM(w), 6) AS mean_b
  FROM weighted GROUP BY b
),
ranked AS (
  SELECT mean_b, ROW_NUMBER() OVER (ORDER BY mean_b, b) AS rn FROM means
),
point AS (
  SELECT ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE)
               / COUNT(*), 6) AS point_mean
  FROM orders
)
SELECT CAST({BOOT_REPLICAS} AS INT) AS n_replicas,
       p.point_mean,
       MAX(CASE WHEN rn = 2 THEN mean_b END) AS ci_lo,
       MAX(CASE WHEN rn = {BOOT_REPLICAS - 1} THEN mean_b END) AS ci_hi
FROM ranked CROSS JOIN point p
GROUP BY p.point_mean
""",
)
def bootstrap_ci_order_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Poisson-bootstrap 90%% confidence interval for the mean order
    value — the ONLINE bootstrap (Owen/Chamandy): instead of resampling
    N rows with replacement (impossible in one distributed pass), each
    row contributes to each of {BOOT_REPLICAS} replicas with a
    deterministic Poisson(1) weight: a 16-bit slice of one of 4 per-row
    md5 digests, compared against hex-literal inverse-CDF thresholds
    (fixed-width lowercase hex sorts numerically, so no per-row int
    conversion).  Replica means bracket the sampling
    distribution; the 2nd/31st order statistics of 32 replicas give the
    ~90%% interval.  The error bar every profiling mean should ship
    with, computed by the engine itself.

    Plan at 100 TB: one scan exploded x{BOOT_REPLICAS} map-side (no
    shuffle to build replicas), one {BOOT_REPLICAS}-group aggregate with
    map-side combine, then O(1) work.  Weight generation is pure hash
    arithmetic — no RNG state, so the result is identical on any
    partitioning/retry (the property that makes bootstrap feasible on a
    cluster at all)."""
    orders = load(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    # 4 digests per ROW (before the explode) — each 128-bit digest feeds 8
    # replicas with a distinct 16-bit slice; see _BOOT_DIGS_SQL.
    digs = orders.withColumn(
        "digs",
        F.array(*[
            F.md5(F.concat(F.lit(f"boot{j}|"), F.col("o_orderkey").cast("string")))
            for j in range(_BOOT_DIGESTS)
        ]),
    )
    # Explode replicas, then derive (u, w) per exploded row: ONE small
    # slice/CASE expression that stays inside whole-stage codegen, applied
    # 32x per row.  Two alternatives were measured and rejected at sf0.1:
    # 64 unrolled per-replica aggregate expressions over the un-exploded
    # scan = 7.9 s (codegen blowup, the round-6 fold lesson), per-row
    # F.transform weight arrays = 40 s (interpreted lambdas).  This shape:
    # 5.4 s, and the explode is map-side — no shuffle grows with it.
    reps = digs.withColumn(
        "b", F.explode(F.sequence(F.lit(0), F.lit(BOOT_REPLICAS - 1)))
    ).withColumn("b", F.col("b").cast("int"))
    u = F.concat(
        F.lit("0"),  # width-5 compare: see the _POIS_HEX width note
        F.substring(
            F.element_at("digs", (F.col("b") / 8).cast("int") + F.lit(1)),
            (F.col("b") % 8) * 4 + 1,
            F.lit(4),
        ),
    )
    w = F.lit(len(_POIS_HEX))
    for k in range(len(_POIS_HEX) - 1, -1, -1):
        w = F.when(F.col("u") < _POIS_HEX[k], k).otherwise(w)
    weighted = reps.withColumn("u", u).select(
        "b", F.col("o_totalprice").alias("x"), w.alias("w")
    )
    means = weighted.groupBy("b").agg(
        F.round(
            F.sum(F.round(F.col("w") * F.col("x"), 6).cast("decimal(18,6)"))
            .cast("double")
            / F.sum("w"),
            6,
        ).alias("mean_b")
    )
    ranked = means.select(
        "mean_b", F.row_number().over(Window.orderBy("mean_b", "b")).alias("rn")
    )
    point = orders.agg(
        F.round(dsum(F.col("o_totalprice")) / F.count(F.lit(1)), 6).alias("point_mean")
    )
    return (
        ranked.crossJoin(point)
        .groupBy("point_mean")
        .agg(
            F.max(F.when(F.col("rn") == 2, F.col("mean_b"))).alias("ci_lo"),
            F.max(
                F.when(F.col("rn") == BOOT_REPLICAS - 1, F.col("mean_b"))
            ).alias("ci_hi"),
        )
        .select(
            F.lit(BOOT_REPLICAS).cast("int").alias("n_replicas"),
            "point_mean",
            "ci_lo",
            "ci_hi",
        )
    )


# ---------------------------------------------------------------------------
# Spearman rank correlation between two model-based quality signals
# ---------------------------------------------------------------------------
def _spearman_oracle() -> str:
    from ..registry import get_spec

    ent = get_spec("char_entropy_quality").oracle.strip()
    lm = get_spec("bigram_lm_doc_score").oracle.strip()
    return f"""
WITH ent AS (SELECT doc_id, char_entropy_nats AS xv FROM ({ent}) t),
lm AS (SELECT doc_id, avg_logprob AS yv FROM ({lm}) t),
j AS (SELECT ent.doc_id, xv, yv FROM ent JOIN lm USING (doc_id)),
xvals AS (SELECT xv, CAST(COUNT(*) AS BIGINT) AS cnt FROM j GROUP BY xv),
xr AS (SELECT xv, 2 * (SUM(cnt) OVER (ORDER BY xv) - cnt) + cnt + 1 AS r2 FROM xvals),
yvals AS (SELECT yv, CAST(COUNT(*) AS BIGINT) AS cnt FROM j GROUP BY yv),
yr AS (SELECT yv, 2 * (SUM(cnt) OVER (ORDER BY yv) - cnt) + cnt + 1 AS r2 FROM yvals),
r AS (SELECT j.doc_id, xr.r2 AS rx, yr.r2 AS ry FROM j JOIN xr USING (xv) JOIN yr USING (yv)),
m AS (
  SELECT CAST(COUNT(*) AS DOUBLE) AS n,
         CAST(SUM(CAST(rx AS DECIMAL(38,0))) AS DOUBLE) AS sx,
         CAST(SUM(CAST(ry AS DECIMAL(38,0))) AS DOUBLE) AS sy,
         CAST(SUM(CAST(rx * ry AS DECIMAL(38,0))) AS DOUBLE) AS sxy,
         CAST(SUM(CAST(rx * rx AS DECIMAL(38,0))) AS DOUBLE) AS sxx,
         CAST(SUM(CAST(ry * ry AS DECIMAL(38,0))) AS DOUBLE) AS syy
  FROM r
)
SELECT CAST(n AS BIGINT) AS n_docs,
       ROUND((n * sxy - sx * sy)
             / (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy)), 6)
         AS spearman_rho
FROM m
"""


@register("spearman_entropy_fluency", oracle=_spearman_oracle())
def spearman_entropy_fluency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spearman rank correlation between two model-based quality signals —
    per-doc character entropy vs bigram-LM fluency — the nonparametric
    check a curation team runs before stacking filters: signals that rank
    documents the same way are redundant gates, anti-correlated ones
    genuinely prune different corners.  Both signals are the engine's own
    registered operators (char_entropy_quality, bigram_lm_doc_score), so
    this correlation can never drift from what the filters actually see.

    Determinism: tied values get the classic AVERAGE rank, carried as
    2x-average-rank = 2·rank_before + cnt + 1 — an INTEGER (doubling both
    rank variables leaves the correlation unchanged), built from the
    per-distinct-value cumulative counts (the el2n device, never a global
    row_number over the fact).  Per-doc rank products fit BIGINT up to
    ~1.5e9 docs (rx·ry ≤ 4N²); moment sums are exact DECIMAL(38,0); the
    closed form runs once in double (IEEE-identical both engines), one
    sqrt pair, rounded to 6.

    Plan at 100 TB: the two signal subplans are the registered operators'
    (both linear); rank tables are windows over DISTINCT-VALUE rollups
    broadcast back; the moments are one map-combinable aggregate."""
    from ..registry import get_spec
    from pyspark.sql import Window as W

    ent = get_spec("char_entropy_quality").fn(spark, sf_dir).select(
        "doc_id", F.col("char_entropy_nats").alias("xv")
    )
    lm = get_spec("bigram_lm_doc_score").fn(spark, sf_dir).select(
        "doc_id", F.col("avg_logprob").alias("yv")
    )
    j = materialize(ent.join(lm, "doc_id"))

    def rank2(col: str) -> DataFrame:
        vals = j.groupBy(col).agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
        w = W.orderBy(col).rowsBetween(W.unboundedPreceding, 0)
        return vals.select(
            col,
            (2 * (F.sum("cnt").over(w) - F.col("cnt")) + F.col("cnt") + 1).alias("r2"),
        )

    r = (
        j.join(F.broadcast(rank2("xv").withColumnRenamed("r2", "rx")), "xv")
        .join(F.broadcast(rank2("yv").withColumnRenamed("r2", "ry")), "yv")
        .select("doc_id", "rx", "ry")
    )
    dec = "decimal(38,0)"
    m = r.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum(F.col("rx").cast(dec)).cast("double").alias("sx"),
        F.sum(F.col("ry").cast(dec)).cast("double").alias("sy"),
        F.sum((F.col("rx") * F.col("ry")).cast(dec)).cast("double").alias("sxy"),
        F.sum((F.col("rx") * F.col("rx")).cast(dec)).cast("double").alias("sxx"),
        F.sum((F.col("ry") * F.col("ry")).cast(dec)).cast("double").alias("syy"),
    )
    return m.select(
        F.col("n").cast("bigint").alias("n_docs"),
        F.round(
            (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy"))
            / (
                F.sqrt(F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx"))
                * F.sqrt(F.col("n") * F.col("syy") - F.col("sy") * F.col("sy"))
            ),
            6,
        ).alias("spearman_rho"),
    )


# ---------------------------------------------------------------------------
# Dataset card (datasheet) summary
# ---------------------------------------------------------------------------
CARD_SHORT_TOKENS = 32


@register(
    "dataset_card_summary",
    oracle=f"""
WITH per AS (
  SELECT doc_id, lang, source, md5(text) AS fp,
         len(list_filter(string_split(text, ' '), w -> w <> '')) AS n_tok
  FROM documents
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_langs,
       CAST(COUNT(DISTINCT source) AS BIGINT) AS n_sources,
       CAST(SUM(n_tok) AS BIGINT) AS total_tokens,
       ROUND(CAST(SUM(n_tok) AS DOUBLE) / COUNT(*), 6) AS mean_doc_tokens,
       ROUND(quantile_cont(n_tok, 0.5), 6) AS p50_doc_tokens,
       CAST(SUM(CASE WHEN n_tok < {CARD_SHORT_TOKENS} THEN 1 ELSE 0 END) AS BIGINT)
         AS short_docs,
       CAST(COUNT(*) - COUNT(DISTINCT fp) AS BIGINT) AS exact_dup_docs,
       ROUND(CAST(COUNT(*) - COUNT(DISTINCT fp) AS DOUBLE) / COUNT(*), 6)
         AS exact_dup_rate
FROM per
""",
)
def dataset_card_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The dataset-card header block (Datasheets for Datasets shape)
    computed in one pass: corpus size, language/source diversity, token
    totals and central tendency, short-doc and exact-duplicate rates —
    the numbers every dataset release publishes, as ONE engine query.

    Exactness: counts are integers; mean and dup-rate are single IEEE
    divisions; the median follows the percentile ≡ quantile_cont parity
    discipline — interpolation operands are INTEGER token counts, so the
    (l+u)/2 midpoint is rounding-order-proof.

    Plan at 100 TB: one documents scan into a doc-level projection, one
    global aggregate (map-side combined; the COUNT DISTINCTs expand per
    key but fingerprint/lang/source are each far below doc count).  The
    exact median deliberately does NOT use ``F.percentile`` — that
    aggregate collects every value into ONE reducer (measured 3.5x wall
    at 10x data); instead the quantile_cont interpolation is computed
    over the (token-count value → count) ROLLUP, which is bounded by the
    max document length regardless of corpus size (the el2n device)."""
    from pyspark.sql import Window

    docs = load(spark, sf_dir, "documents")
    per = materialize(
        docs.select(
            "lang",
            "source",
            F.md5("text").alias("fp"),
            F.size(F.filter(F.split("text", " "), lambda w: w != "")).alias(
                "n_tok"
            ),
        )
    )
    base = per.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.countDistinct("lang").cast("bigint").alias("n_langs"),
        F.countDistinct("source").cast("bigint").alias("n_sources"),
        F.sum("n_tok").cast("bigint").alias("total_tokens"),
        F.round(
            F.sum("n_tok").cast("double") / F.count(F.lit(1)), 6
        ).alias("mean_doc_tokens"),
        F.sum(F.when(F.col("n_tok") < CARD_SHORT_TOKENS, 1).otherwise(0))
        .cast("bigint")
        .alias("short_docs"),
        (F.count(F.lit(1)) - F.countDistinct("fp"))
        .cast("bigint")
        .alias("exact_dup_docs"),
        F.round(
            (F.count(F.lit(1)) - F.countDistinct("fp")).cast("double")
            / F.count(F.lit(1)),
            6,
        ).alias("exact_dup_rate"),
    )
    # quantile_cont(0.5) off the value rollup: pos = (n-1)/2; lower/upper
    # are the values whose cumulative count brackets pos; midpoint exact
    # (integer operands).  The rollup is max-doc-length-sized.
    rollup = per.groupBy("n_tok").agg(F.count(F.lit(1)).alias("c"))
    wcum = Window.orderBy("n_tok").rowsBetween(Window.unboundedPreceding, 0)
    cum = rollup.select(
        "n_tok", (F.sum("c").over(wcum) - F.col("c")).alias("before"), "c"
    )
    n_total = per.count()  # O(1) driver scalar sizes the rank literals
    lo_rank = (n_total - 1) // 2
    hi_rank = n_total // 2
    med = (
        cum.filter(
            (F.col("before") <= hi_rank) & (F.col("before") + F.col("c") > lo_rank)
        )
        .agg(
            F.min(F.when(F.col("before") + F.col("c") > lo_rank, F.col("n_tok"))).alias("lo"),
            F.max(F.when(F.col("before") <= hi_rank, F.col("n_tok"))).alias("hi"),
        )
        .select(
            F.round(
                (F.col("lo").cast("double") + F.col("hi").cast("double")) / 2, 6
            ).alias("p50_doc_tokens")
        )
    )
    return base.crossJoin(F.broadcast(med)).select(
        "n_docs",
        "n_langs",
        "n_sources",
        "total_tokens",
        "mean_doc_tokens",
        "p50_doc_tokens",
        "short_docs",
        "exact_dup_docs",
        "exact_dup_rate",
    )


# ---------------------------------------------------------------------------
# Join-key skew diagnosis: WHICH keys are hot, and how much salt each needs
# ---------------------------------------------------------------------------
SKEW_TOPN = 10


@register(
    "skew_key_diagnosis",
    oracle=f"""
WITH per_key AS (
  SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_rows
  FROM events GROUP BY user_id
),
tot AS (
  SELECT CAST(SUM(n_rows) AS BIGINT) AS total,
         CAST(COUNT(*) AS BIGINT) AS n_keys
  FROM per_key
)
SELECT user_id, n_rows,
       ROUND(CAST(n_rows AS DOUBLE) / total, 6) AS share,
       ROUND(CAST(n_rows * n_keys AS DOUBLE) / total, 6) AS skew_ratio,
       CAST((n_rows * n_keys + total - 1) // total AS BIGINT) AS rec_salts
FROM per_key CROSS JOIN tot
ORDER BY n_rows DESC, user_id
LIMIT {SKEW_TOPN}
""",
)
def skew_key_diagnosis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Key-level join-skew diagnosis: the top-{SKEW_TOPN} heaviest join
    keys on the fact side (events.user_id), each with its row share,
    skew ratio vs the mean key, and the recommended salting fan-out —
    ceil(n_rows / mean_per_key), the number of salt buckets that brings
    the key's largest salted partition back to an average-key workload.
    ``partition_skew_stats`` answers "is this shuffle skewed?"; this
    answers "which keys, and what salt factor fixes each?" — the input
    to ``extensions.salted_join_event_enrich``'s fan-out constant.

    Determinism: counts and the ceiling division are exact bigint
    arithmetic; the two ratios are single IEEE divisions rounded to 6;
    ties in the top-{SKEW_TOPN} order break on the key.

    Plan at 100 TB: one map-side-combined count per key (the only
    fact-sized shuffle), a 1-row broadcast of the totals, then a
    TakeOrderedAndProject over the key rollup — no sort of the full
    rollup, no second pass over the facts."""
    from ..functions.numerics import int_div

    ev = load(spark, sf_dir, "events")
    per_key = ev.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows")
    )
    tot = per_key.agg(
        F.sum("n_rows").cast("bigint").alias("total"),
        F.count(F.lit(1)).cast("bigint").alias("n_keys"),
    )
    return (
        per_key.crossJoin(F.broadcast(tot))
        .select(
            "user_id",
            "n_rows",
            F.round(F.col("n_rows").cast("double") / F.col("total"), 6).alias(
                "share"
            ),
            F.round(
                (F.col("n_rows") * F.col("n_keys")).cast("double")
                / F.col("total"),
                6,
            ).alias("skew_ratio"),
            int_div(
                F.col("n_rows") * F.col("n_keys") + F.col("total") - 1,
                F.col("total"),
            ).alias("rec_salts"),
        )
        .orderBy(F.col("n_rows").desc(), "user_id")
        .limit(SKEW_TOPN)
    )


# ---------------------------------------------------------------------------
# Functional-dependency discovery (Metanome-style FD audit)
# ---------------------------------------------------------------------------
_FD_CANDIDATES = (
    ("orders", "o_orderkey", "o_custkey"),
    ("orders", "o_custkey", "o_orderpriority"),
    ("lineitem", "l_orderkey", "l_suppkey"),
    ("lineitem", "l_partkey", "l_suppkey"),
    ("customer", "c_custkey", "c_nationkey"),
    ("customer", "c_nationkey", "c_mktsegment"),
)


@register(
    "functional_dependency_audit",
    oracle="\nUNION ALL\n".join(
        f"""SELECT '{t}' AS table_name, '{lhs}' AS determinant, '{rhs}' AS dependent,
       CAST(COUNT(DISTINCT {lhs}) AS BIGINT) AS n_lhs,
       CAST(COUNT(*) AS BIGINT) AS n_lhs_rhs,
       CAST(CASE WHEN COUNT(*) = COUNT(DISTINCT {lhs}) THEN 1 ELSE 0 END AS INT)
         AS holds,
       CAST(COUNT(*) - COUNT(DISTINCT {lhs}) AS BIGINT) AS n_violating_groups
FROM (SELECT DISTINCT {lhs}, {rhs} FROM {t}) p"""
        for t, lhs, rhs in _FD_CANDIDATES
    )
    + "\nORDER BY table_name, determinant, dependent",
)
def functional_dependency_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Functional-dependency discovery over candidate column pairs: does
    LHS determine RHS?  An FD holds iff the distinct (LHS, RHS) pair
    count equals the distinct LHS count; the violation count is how many
    LHS values map to multiple RHS values.  This is the schema-profiling
    pass (Metanome / data-catalog shape) that finds denormalization
    opportunities, validates assumed keys before they become join
    assumptions, and catches silently-broken dimensions (a custkey with
    two nations) before a 100 TB backfill bakes them in.

    Expected on this schema: the key-determined pairs hold
    (orderkey→custkey, custkey→nationkey), the coarse ones don't
    (custkey→priority varies per order) — the audit REPORTS rather than
    assumes, which is the point.

    Determinism: pure integer distinct counts.

    Plan at 100 TB: per pair, one DISTINCT projection of two columns —
    map-side partial distinct collapses to the pair alphabet before the
    exchange (never the EXPAND a multi-column countDistinct would
    trigger), then an O(1) aggregate; the six legs union to a 6-row
    result."""
    out = None
    for t, lhs, rhs in _FD_CANDIDATES:
        pairs = load(spark, sf_dir, t).select(lhs, rhs).distinct()
        leg = pairs.agg(
            F.countDistinct(lhs).cast("bigint").alias("n_lhs"),
            F.count(F.lit(1)).cast("bigint").alias("n_lhs_rhs"),
        ).select(
            F.lit(t).alias("table_name"),
            F.lit(lhs).alias("determinant"),
            F.lit(rhs).alias("dependent"),
            "n_lhs",
            "n_lhs_rhs",
            F.when(F.col("n_lhs_rhs") == F.col("n_lhs"), 1)
            .otherwise(0)
            .cast("int")
            .alias("holds"),
            (F.col("n_lhs_rhs") - F.col("n_lhs"))
            .cast("bigint")
            .alias("n_violating_groups"),
        )
        out = leg if out is None else out.unionByName(leg)
    return out.orderBy("table_name", "determinant", "dependent")


# ---------------------------------------------------------------------------
# Neyman allocation: stratified sample budgets proportional to N_h * sigma_h
# ---------------------------------------------------------------------------
NEYMAN_BUDGET = 10_000  # total samples to allocate across strata


@register(
    "neyman_allocation_plan",
    oracle=f"""
WITH strata AS (
  SELECT o_orderpriority AS stratum,
         CAST(COUNT(*) AS BIGINT) AS n_rows,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS sx,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(25,4))
                  * CAST(o_totalprice AS DECIMAL(12,4))) AS DOUBLE) AS sx2
  FROM orders GROUP BY o_orderpriority
),
sig AS (
  SELECT stratum, n_rows,
         ROUND(sqrt(sx2 / n_rows - (sx / n_rows) * (sx / n_rows)), 6) AS sigma
  FROM strata
),
tot AS (
  SELECT CAST(SUM(CAST(ROUND(n_rows * sigma, 6) AS DECIMAL(28,6))) AS DOUBLE)
    AS total_mass
  FROM sig
)
SELECT stratum, n_rows, sigma,
       ROUND(ROUND(n_rows * sigma, 6) / total_mass, 6) AS alloc_frac,
       CAST(FLOOR({NEYMAN_BUDGET} * ROUND(ROUND(n_rows * sigma, 6) / total_mass, 6))
            AS BIGINT) AS alloc_n
FROM sig CROSS JOIN tot
ORDER BY stratum
""",
)
def neyman_allocation_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Neyman (optimal) stratified-sampling allocation: split a budget of
    {NEYMAN_BUDGET} samples across order-priority strata proportional to
    N_h·σ_h — variable strata earn more samples, so the stratified
    estimator's variance is minimized at fixed cost.  Proportional
    allocation (plain ``stratified_sample_docs``) ignores σ; this is the
    survey-statistics upgrade a 100 TB audit sample should use when
    per-stratum spread differs by orders of magnitude.

    Determinism: per-stratum moments accumulate in exact DECIMAL; σ, the
    mass products, the fractions, and the floored allocations follow the
    round-before-reuse chain (each double op applied to identically
    rounded operands in both engines); the 5-term normalizer sums in
    DECIMAL so accumulation order cannot matter.

    Plan at 100 TB: ONE map-side-combined aggregate over the facts (the
    moment rollup is |strata| rows), then pure arithmetic on that
    metadata-sized table with a broadcast 1-row normalizer."""
    orders = load(spark, sf_dir, "orders")
    xdec = F.col("o_totalprice").cast("decimal(18,6)")
    # The square term multiplies asymmetric DECIMAL widths — (25,4)x(12,4)
    # — because DuckDB executes a product of two int64-backed decimals in
    # int64 (overflowing on x^2 ~ 1e18 scaled units) and only widens to
    # int128 when an operand is already beyond 18 digits.  Both engines
    # produce the exact DECIMAL(38,8) product; values are 2-dp currency,
    # exactly representable at scale 4.
    strata = orders.groupBy(F.col("o_orderpriority").alias("stratum")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        F.sum(xdec).cast("double").alias("sx"),
        F.sum(
            F.col("o_totalprice").cast("decimal(25,4)")
            * F.col("o_totalprice").cast("decimal(12,4)")
        ).cast("double").alias("sx2"),
    )
    sig = strata.select(
        "stratum",
        "n_rows",
        F.round(
            F.sqrt(
                F.col("sx2") / F.col("n_rows")
                - (F.col("sx") / F.col("n_rows"))
                * (F.col("sx") / F.col("n_rows"))
            ),
            6,
        ).alias("sigma"),
    )
    mass = F.round(F.col("n_rows") * F.col("sigma"), 6)
    tot = sig.agg(
        F.sum(mass.cast("decimal(28,6)")).cast("double").alias("total_mass")
    )
    return (
        sig.crossJoin(F.broadcast(tot))
        .select(
            "stratum",
            "n_rows",
            "sigma",
            F.round(mass / F.col("total_mass"), 6).alias("alloc_frac"),
            F.floor(
                NEYMAN_BUDGET * F.round(mass / F.col("total_mass"), 6)
            )
            .cast("bigint")
            .alias("alloc_n"),
        )
        .orderBy("stratum")
    )
