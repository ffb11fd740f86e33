"""Text-analysis operators over the documents table (north-star extension:
language ID, quality scoring, token counting, fingerprinting, word counts).

The reference's only text processing is BeautifulSoup text extraction and
file naming (``scripts/spiders/web_spider_oo.py:352-359,367-390``); this
module supplies the text layer a 100 TB training-data pipeline needs.  All
operators are pure Catalyst expressions (split/transform/filter/aggregate)
— no Python UDFs in the hot path — so they stay in whole-stage codegen and
scale linearly with a shuffle only where a groupBy genuinely needs one.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..checkpointing import materialize
from ..functions.numerics import dsum, int_div, oracle_dsum
from ..registry import register
from ..sources.tables import load, load_spread

# Tiny per-language marker lexicons for the heuristic language scorer.
# The fixture text is an engine-vocabulary word soup, so English function
# words are the only markers that actually occur — the other lists make
# the argmax structure real (they legitimately score 0).
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and", "to"),
    "es": ("el", "la", "de", "los", "que"),
    "de": ("der", "die", "das", "und", "nicht"),
    "fr": ("le", "la", "les", "des", "est"),
}


@register(
    "tokenize_wordcount",
    oracle="""
SELECT word, COUNT(*) AS n
FROM (
  SELECT unnest(string_split(text, ' ')) AS word FROM documents
) t
WHERE word <> ''
GROUP BY word
ORDER BY n DESC, word
""",
)
def tokenize_wordcount(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus word count: split → explode → groupBy → count (the parse-to-
    rows shape of the reference's link extraction, web_spider_oo.py:251-263).

    Scale: explode multiplies rows ~60×, but partial aggregation combines
    map-side before the shuffle, so shuffle volume is |vocab| per task.
    """
    docs = load(spark, sf_dir, "documents")
    return (
        docs.select(F.explode(F.split("text", " ")).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), "word")
    )


@register(
    "token_count_stats",
    oracle="""
SELECT doc_id,
       len(list_filter(string_split(text, ' '), w -> w <> '')) AS n_tokens,
       length(text) AS n_chars_actual,
       len(list_filter(string_split(text, ' '), w -> length(w) >= 6)) AS n_long_tokens
FROM documents
""",
)
def token_count_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document token counting (whitespace tokenizer) — the token-count
    operator of the training-data pipeline."""
    docs = load(spark, sf_dir, "documents")
    toks = F.filter(F.split("text", " "), lambda w: w != "")
    return docs.select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        F.length("text").alias("n_chars_actual"),
        F.size(F.filter(F.split("text", " "), lambda w: F.length(w) >= 6)).alias(
            "n_long_tokens"
        ),
    )


@register(
    "bpe_ish_token_count",
    oracle="""
SELECT doc_id,
       len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]')) AS n_bpe_tokens
FROM documents
""",
)
def bpe_ish_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE-ish token counting: alpha runs / digit runs / single punctuation
    as separate tokens (regex pre-tokenizer shape used by BPE vocabularies)."""
    docs = load(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.size(F.expr("regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]', 0)")).alias(
            "n_bpe_tokens"
        ),
    )


@register(
    "lang_id_heuristic",
    oracle=f"""
WITH scored AS (
  SELECT doc_id, lang AS lang_actual,
         len(list_filter(string_split(text, ' '), w -> w IN ('the','a','of','and','to'))) AS en_hits,
         len(list_filter(string_split(text, ' '), w -> w IN ('el','la','de','los','que'))) AS es_hits,
         len(list_filter(string_split(text, ' '), w -> w IN ('der','die','das','und','nicht'))) AS de_hits,
         len(list_filter(string_split(text, ' '), w -> w IN ('le','la','les','des','est'))) AS fr_hits,
         len(list_filter(string_split(text, ' '), w -> w <> '')) AS n_tokens
  FROM documents
)
SELECT doc_id, lang_actual, en_hits, es_hits, de_hits, fr_hits,
       CASE WHEN en_hits >= es_hits AND en_hits >= de_hits AND en_hits >= fr_hits AND en_hits > 0 THEN 'en'
            WHEN es_hits >= de_hits AND es_hits >= fr_hits AND es_hits > 0 THEN 'es'
            WHEN de_hits >= fr_hits AND de_hits > 0 THEN 'de'
            WHEN fr_hits > 0 THEN 'fr'
            ELSE 'unknown' END AS lang_pred
FROM scored
""",
)
def lang_id_heuristic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic language ID: count marker-word hits per language, argmax
    with a deterministic tie order (en > es > de > fr > unknown)."""
    docs = load(spark, sf_dir, "documents")
    toks = F.split("text", " ")

    # Closure factory keeps the higher-order-function lambda unary: a
    # default arg (lambda w, m=markers: ...) would make PySpark treat it
    # as a two-argument lambda and bind m to a lambda-variable Column.
    def _marker_pred(markers: tuple[str, ...]):
        return lambda w: w.isin(*markers)

    hits = {
        lang: F.size(F.filter(toks, _marker_pred(markers)))
        for lang, markers in LANG_MARKERS.items()
    }
    df = docs.select(
        "doc_id",
        F.col("lang").alias("lang_actual"),
        hits["en"].alias("en_hits"),
        hits["es"].alias("es_hits"),
        hits["de"].alias("de_hits"),
        hits["fr"].alias("fr_hits"),
        F.size(F.filter(toks, lambda w: w != "")).alias("n_tokens"),
    )
    pred = (
        F.when(
            (F.col("en_hits") >= F.col("es_hits"))
            & (F.col("en_hits") >= F.col("de_hits"))
            & (F.col("en_hits") >= F.col("fr_hits"))
            & (F.col("en_hits") > 0),
            F.lit("en"),
        )
        .when(
            (F.col("es_hits") >= F.col("de_hits"))
            & (F.col("es_hits") >= F.col("fr_hits"))
            & (F.col("es_hits") > 0),
            F.lit("es"),
        )
        .when((F.col("de_hits") >= F.col("fr_hits")) & (F.col("de_hits") > 0), F.lit("de"))
        .when(F.col("fr_hits") > 0, F.lit("fr"))
        .otherwise(F.lit("unknown"))
    )
    return df.select(
        "doc_id", "lang_actual", "en_hits", "es_hits", "de_hits", "fr_hits",
        pred.alias("lang_pred"),
    ).drop("n_tokens")


QUALITY_STOPWORDS = ("the", "a", "of", "and", "to", "in", "is")


def quality_features(docs: DataFrame) -> DataFrame:
    """Per-document quality features (char count, token count, stopword
    count) — shared by quality_score and curation.quality_percentile_filter
    so the two filters cannot drift."""
    toks = F.filter(F.split("text", " "), lambda w: w != "")
    n_stop = F.size(
        F.filter(F.split("text", " "), lambda w: w.isin(*QUALITY_STOPWORDS))
    )
    return docs.select(
        "*",
        F.length("text").alias("n_chars_actual"),
        F.size(toks).alias("n_tokens"),
        n_stop.alias("n_stopwords"),
    )


@register(
    "quality_score",
    oracle="""
WITH feats AS (
  SELECT doc_id,
         length(text) AS n_chars_actual,
         len(list_filter(string_split(text, ' '), w -> w <> '')) AS n_tokens,
         len(list_filter(string_split(text, ' '),
                         w -> w IN ('the','a','of','and','to','in','is'))) AS n_stopwords
  FROM documents
)
SELECT doc_id, n_tokens, n_stopwords,
       CAST(n_chars_actual AS DOUBLE) / n_tokens AS avg_token_len,
       CAST(n_stopwords AS DOUBLE) / n_tokens AS stopword_ratio,
       CASE WHEN n_tokens >= 20
             AND CAST(n_stopwords AS DOUBLE) / n_tokens BETWEEN 0.01 AND 0.5
            THEN 1 ELSE 0 END AS quality_keep
FROM feats
""",
)
def quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document quality scoring: length, stopword ratio, average token
    length, and a keep/drop gate — the C4-style quality filter shape."""
    docs = load(spark, sf_dir, "documents")
    feats = quality_features(docs).select(
        "doc_id", "n_chars_actual", "n_tokens", "n_stopwords"
    )
    ratio = F.col("n_stopwords").cast("double") / F.col("n_tokens")
    return feats.select(
        "doc_id",
        "n_tokens",
        "n_stopwords",
        (F.col("n_chars_actual").cast("double") / F.col("n_tokens")).alias("avg_token_len"),
        ratio.alias("stopword_ratio"),
        F.when((F.col("n_tokens") >= 20) & ratio.between(0.01, 0.5), F.lit(1))
        .otherwise(F.lit(0))
        .alias("quality_keep"),
    )


@register(
    "doc_fingerprint",
    oracle=r"""
SELECT doc_id,
       md5(lower(trim(regexp_replace(text, '\s+', ' ', 'g')))) AS fingerprint
FROM documents
""",
)
def doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Normalized document fingerprint: lowercase, collapse whitespace,
    trim, md5 — the content-hash dedup key (reference's commented-out
    hash naming, web_spider_oo.py:386, grown into a document fingerprint)."""
    docs = load(spark, sf_dir, "documents")
    normalized = F.lower(F.trim(F.regexp_replace("text", r"\s+", " ")))
    return docs.select("doc_id", F.md5(normalized).alias("fingerprint"))


@register(
    "wordcount_by_source",
    oracle=f"""
SELECT source, word, COUNT(*) AS n
FROM (
  SELECT source, unnest(string_split(text, ' ')) AS word FROM documents
) t
WHERE word IN ('join', 'filter', 'scan')
GROUP BY source, word
""",
)
def wordcount_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped word count restricted to a keyword set — the filtered
    explode+agg composition."""
    docs = load(spark, sf_dir, "documents")
    return (
        docs.select("source", F.explode(F.split("text", " ")).alias("word"))
        .filter(F.col("word").isin("join", "filter", "scan"))
        .groupBy("source", "word")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@register(
    "char_entropy_quality",
    oracle="""
WITH chars AS (
  SELECT doc_id, unnest(string_split(text, '')) AS c FROM documents
),
counts AS (
  SELECT doc_id, c, COUNT(*) AS n_c FROM chars GROUP BY doc_id, c
),
terms AS (
  SELECT doc_id, n_c, round(ln(CAST(n_c AS DOUBLE)), 9) AS ln_nc FROM counts
),
per_doc AS (
  SELECT doc_id,
         CAST(SUM(n_c) AS BIGINT) AS n_chars_total,
         CAST(COUNT(*) AS INT) AS n_distinct_chars,
         CAST(SUM(CAST(n_c * ln_nc AS DECIMAL(28,9))) AS DOUBLE) AS s
  FROM terms GROUP BY doc_id
)
SELECT doc_id, n_chars_total, n_distinct_chars,
       round(round(ln(CAST(n_chars_total AS DOUBLE)), 9) - s / n_chars_total, 6)
         AS char_entropy_nats
FROM per_doc
""",
)
def char_entropy_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document Shannon character entropy (nats) — the
    randomness/quality signal that separates natural prose (~3 nats)
    from base64 blobs (high) and repeated filler (near 0); a standard
    cheap filter column in corpus curation.

    Uses H = ln(N) − (Σ n_c·ln n_c)/N so the only divisions happen once
    per document at the end.  Cross-engine exactness: ln values are
    rounded to 9 decimals BEFORE the DECIMAL sum (libm log differs in the
    last ulp between engines; rounding makes both sides identical — the
    same discipline as the TF-IDF and bigram-LM scores), final entropy
    rounded to 6.  One explode + one (doc, char)-keyed aggregate, both
    map-side combined; alphabet size bounds the second aggregate's state.
    """
    chars = (
        load_spread(spark, sf_dir, "documents")  # char explode is compute-bound
        .select("doc_id", F.explode(F.split("text", "")).alias("c"))
    )
    counts = chars.groupBy("doc_id", "c").agg(F.count(F.lit(1)).alias("n_c"))
    terms = counts.select(
        "doc_id",
        "n_c",
        F.round(F.log(F.col("n_c").cast("double")), 9).alias("ln_nc"),
    )
    per_doc = terms.groupBy("doc_id").agg(
        F.sum("n_c").cast("bigint").alias("n_chars_total"),
        F.count(F.lit(1)).cast("int").alias("n_distinct_chars"),
        F.sum((F.col("n_c") * F.col("ln_nc")).cast("decimal(28,9)"))
        .cast("double")
        .alias("s"),
    )
    return per_doc.select(
        "doc_id",
        "n_chars_total",
        "n_distinct_chars",
        F.round(
            F.round(F.log(F.col("n_chars_total").cast("double")), 9)
            - F.col("s") / F.col("n_chars_total"),
            6,
        ).alias("char_entropy_nats"),
    )


BPE_TOP_MERGES = 20


@register(
    "bpe_top_merges",
    oracle=f"""
WITH words AS (
  SELECT unnest(string_split(text, ' ')) AS w FROM documents
),
words_ne AS (SELECT w FROM words WHERE length(w) >= 2),
pairs AS (
  SELECT substr(w, i, 2) AS pair
  FROM words_ne CROSS JOIN unnest(range(1, length(w))) t(i)
)
SELECT pair, COUNT(*) AS n
FROM pairs GROUP BY pair
ORDER BY n DESC, pair LIMIT {BPE_TOP_MERGES}
""",
)
def bpe_top_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The first BPE vocabulary-induction step: corpus-wide adjacent
    character-pair frequencies (every word OCCURRENCE counts, as real BPE
    training does), top-{BPE_TOP_MERGES} merge candidates.  Iterating
    this (merge the winner, re-count) is the whole BPE trainer; one step
    is the oracle-checkable unit because later rounds depend on merged
    symbols.

    Plan: explode words → explode pair positions (map-side), one pair
    count aggregate with map-side combine, TakeOrderedAndProject — the
    word-count shape on a pair alphabet.  At scale the re-count per
    merge round touches only words containing the merged pair (a
    contains() pushdown)."""
    docs = load(spark, sf_dir, "documents")
    words = docs.select(F.explode(F.split("text", " ")).alias("w")).filter(
        F.length("w") >= 2
    )
    pairs = words.select(
        F.explode(F.sequence(F.lit(1), F.length("w") - 1)).alias("i"), "w"
    ).select(F.substring(F.col("w"), F.col("i"), F.lit(2)).alias("pair"))
    return (
        pairs.groupBy("pair")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), "pair")
        .limit(BPE_TOP_MERGES)
    )


# ---------------------------------------------------------------------------
# Iterated BPE training (the actual vocab-induction loop, not just round 1)
# ---------------------------------------------------------------------------
BPE_ROUNDS = 3
_BPE_SEP = "\x1f"  # unit separator: symbol delimiter, absent from the corpus
# Merging is greedy left-to-right non-overlapping, realized as string
# replace of SEP+l+SEP+r+SEP -> SEP+lr+SEP.  One replace pass consumes the
# trailing separator of each match, so an immediately following occurrence
# is skipped; a FIXED number of passes (3) is applied on BOTH engines, so
# the corpora agree bit-for-bit even before convergence (a pytest asserts
# a 4th pass changes nothing on the fixture).
_BPE_PASSES = 3


def _bpe_sym_string(col):
    """word -> SEP-delimited char-symbol string: 'ab' -> '\\x1fa\\x1fb\\x1f'."""
    return F.concat(F.lit(_BPE_SEP), F.regexp_replace(col, "(.)", "$1" + _BPE_SEP))


def _bpe_syms(col):
    return F.filter(F.split(col, _BPE_SEP), lambda x: x != F.lit(""))


def _bpe_pairs(corpus: DataFrame) -> DataFrame:
    syms = F.col("syms")
    pairs = F.transform(
        F.slice(syms, F.lit(1), F.size(syms) - 1),
        lambda x, i: F.struct(x.alias("l_sym"), F.element_at(syms, i + F.lit(2)).alias("r_sym")),
    )
    return (
        corpus.withColumn("syms", _bpe_syms(F.col("s")))
        .select(F.explode(pairs).alias("p"))
        .groupBy(F.col("p.l_sym").alias("l_sym"), F.col("p.r_sym").alias("r_sym"))
        .agg(F.count(F.lit(1)).alias("n"))
    )


def _bpe_oracle() -> str:
    sep = "chr(31)"
    sql = f"""
WITH c0 AS (
  SELECT {sep} || regexp_replace(w, '(.)', '\\1' || {sep}, 'g') AS s
  FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents)
  WHERE length(w) >= 2
)"""
    for r in range(1, BPE_ROUNDS + 1):
        prev = f"c{r - 1}"
        sql += f""",
x{r} AS (SELECT list_filter(string_split(s, {sep}), x -> x <> '') AS syms FROM {prev}),
p{r} AS (SELECT syms[i] AS l_sym, syms[i+1] AS r_sym
         FROM x{r} CROSS JOIN unnest(range(1, len(syms))) t(i)),
win{r} AS (
  SELECT l_sym, r_sym, CAST(COUNT(*) AS BIGINT) AS n,
         {sep} || l_sym || {sep} || r_sym || {sep} AS pat,
         {sep} || l_sym || r_sym || {sep} AS rep
  FROM p{r} GROUP BY l_sym, r_sym ORDER BY n DESC, l_sym, r_sym LIMIT 1
),
c{r} AS (
  SELECT replace(replace(replace(s, w.pat, w.rep), w.pat, w.rep), w.pat, w.rep) AS s
  FROM {prev} CROSS JOIN win{r} w
)"""
    unions = "\nUNION ALL\n".join(
        f"SELECT {r} AS round, l_sym, r_sym, l_sym || r_sym AS merged, n FROM win{r}"
        for r in range(1, BPE_ROUNDS + 1)
    )
    return sql + f"\nSELECT * FROM ({unions}) ORDER BY round"


@register("bpe_train_merges", oracle=_bpe_oracle())
def bpe_train_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Iterated BPE vocabulary induction: {BPE_ROUNDS} merge rounds, each
    re-counting adjacent SYMBOL pairs over the corpus AFTER applying the
    previous winners — the actual BPE trainer loop (bpe_top_merges is its
    round-1 candidate list).  Winner per round = max count, ties broken
    lexicographically; merging is greedy left-to-right via {_BPE_PASSES}
    fixed replace passes (identical on both engines).

    Driver loop discipline: each round collects exactly ONE winner row
    (the kmeans-inertia pattern — O(rounds) driver scalars, never data);
    the next round's plan bakes the winner in as literals.

    Plan at 100 TB: per round, one map-side pair explode + one combinable
    count aggregate + a top-1 (TakeOrderedAndProject); the merge itself
    is a map-only string replace.  Real trainers amortize further by
    re-counting only words CONTAINING the merged pair (a contains()
    pushdown on the delta); rounds here are few and unrolled."""
    docs = load_spread(spark, sf_dir, "documents")
    words = docs.select(F.explode(F.split("text", " ")).alias("w")).filter(
        F.length("w") >= 2
    )
    corpus = words.select(_bpe_sym_string(F.col("w")).alias("s"))
    out_rows = []
    for r in range(1, BPE_ROUNDS + 1):
        win = (
            _bpe_pairs(corpus)
            .orderBy(F.col("n").desc(), "l_sym", "r_sym")
            .limit(1)
            .collect()[0]
        )
        l, rr, n = win["l_sym"], win["r_sym"], win["n"]
        out_rows.append((r, l, rr, l + rr, n))
        pat = F.lit(_BPE_SEP + l + _BPE_SEP + rr + _BPE_SEP)
        rep = F.lit(_BPE_SEP + l + rr + _BPE_SEP)
        merged = F.col("s")
        for _ in range(_BPE_PASSES):
            merged = F.replace(merged, pat, rep)
        # truncate lineage: round r+1's pair count must not re-run rounds
        # 1..r's replaces from the raw scan (3 rounds -> 6 redundant passes)
        corpus = materialize(corpus.select(merged.alias("s")))
    return spark.createDataFrame(
        out_rows, "round int, l_sym string, r_sym string, merged string, n long"
    )


# ---------------------------------------------------------------------------
# Tokenizer application: run the learned merge table over the corpus
# ---------------------------------------------------------------------------
def _bpe_apply_oracle() -> str:
    # winners win1..winN come from the SAME chain bpe_train_merges uses;
    # the apply chain then tokenizes EVERY word (single-char words too —
    # they are 1 token each; merges simply cannot match inside them).
    train = _bpe_oracle()
    train_ctes = train[: train.rindex("\nSELECT * FROM (")]
    sep = "chr(31)"
    apply_chain = f""",
a0 AS (
  SELECT doc_id, lang, n_chars,
         {sep} || regexp_replace(w, '(.)', '\\1' || {sep}, 'g') AS s
  FROM (SELECT doc_id, lang, n_chars, unnest(string_split(text, ' ')) AS w
        FROM documents)
)"""
    prev = "a0"
    for r in range(1, BPE_ROUNDS + 1):
        apply_chain += f""",
a{r} AS (
  SELECT doc_id, lang, n_chars,
         replace(replace(replace(s, w.pat, w.rep), w.pat, w.rep), w.pat, w.rep) AS s
  FROM {prev} CROSS JOIN win{r} w
)"""
        prev = f"a{r}"
    return (
        train_ctes
        + apply_chain
        + f""",
doc_tokens AS (
  SELECT doc_id, MIN(lang) AS lang, MIN(n_chars) AS n_chars,
         SUM(len(list_filter(string_split(s, {sep}), x -> x <> ''))) AS n_tokens
  FROM {prev} GROUP BY doc_id
)
SELECT lang,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
       ROUND(CAST(SUM(n_chars) AS DOUBLE) / SUM(n_tokens), 6) AS chars_per_token
FROM doc_tokens GROUP BY lang"""
    )


@register("bpe_apply_tokenize", oracle=_bpe_apply_oracle())
def bpe_apply_tokenize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer APPLICATION: re-derive the {BPE_ROUNDS}-round merge
    table (same loop as bpe_train_merges) and run it over EVERY word of
    every document, reporting per-language token counts and the
    chars-per-token compression ratio — the metric BPE training
    optimizes and the number every training-cost estimate starts from.

    Plan at 100 TB: the merge table is tiny (driver literals); applying
    it is a map-only chain of string replaces over the corpus — zero
    shuffles until the per-doc/per-lang rollup.  A production tokenizer
    ships thousands of merges through a trie (not a replace chain), but
    the data flow — broadcast merge table, map-side apply, rollup — is
    exactly this."""
    docs = load_spread(spark, sf_dir, "documents")
    words = docs.select(F.explode(F.split("text", " ")).alias("w")).filter(
        F.length("w") >= 2
    )
    corpus = words.select(_bpe_sym_string(F.col("w")).alias("s"))
    winners = []
    for _ in range(BPE_ROUNDS):
        win = (
            _bpe_pairs(corpus)
            .orderBy(F.col("n").desc(), "l_sym", "r_sym")
            .limit(1)
            .collect()[0]
        )
        winners.append((win["l_sym"], win["r_sym"]))
        pat = F.lit(_BPE_SEP + win["l_sym"] + _BPE_SEP + win["r_sym"] + _BPE_SEP)
        rep = F.lit(_BPE_SEP + win["l_sym"] + win["r_sym"] + _BPE_SEP)
        merged = F.col("s")
        for _ in range(_BPE_PASSES):
            merged = F.replace(merged, pat, rep)
        corpus = materialize(corpus.select(merged.alias("s")))
    doc_words = docs.select(
        "doc_id", "lang", "n_chars", F.explode(F.split("text", " ")).alias("w")
    )
    s = _bpe_sym_string(F.col("w"))
    for l, r in winners:
        pat = F.lit(_BPE_SEP + l + _BPE_SEP + r + _BPE_SEP)
        rep = F.lit(_BPE_SEP + l + r + _BPE_SEP)
        for _ in range(_BPE_PASSES):
            s = F.replace(s, pat, rep)
    tokenized = doc_words.select(
        "doc_id", "lang", "n_chars", F.size(_bpe_syms(s)).alias("n_word_tokens")
    )
    doc_tokens = tokenized.groupBy("doc_id").agg(
        F.min("lang").alias("lang"),
        F.min("n_chars").alias("n_chars"),
        F.sum("n_word_tokens").alias("n_tokens"),
    )
    return doc_tokens.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("total_tokens"),
        F.round(F.sum("n_chars").cast("double") / F.sum("n_tokens"), 6).alias(
            "chars_per_token"
        ),
    )


# ---------------------------------------------------------------------------
# Lexical-diversity profile (distinct-n / type-token ratios per source)
# ---------------------------------------------------------------------------
@register(
    "ngram_diversity_by_source",
    oracle="""
WITH toked AS (
  SELECT source, list_filter(string_split(text, ' '), w -> w <> '') AS toks
  FROM documents
),
words AS (
  SELECT source, unnest(toks) AS w FROM toked
),
bigrams AS (
  SELECT source, unnest(list_transform(range(1, len(toks)),
                                       i -> toks[i] || ' ' || toks[i+1])) AS bg
  FROM toked WHERE len(toks) >= 2
),
wstat AS (
  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_tokens,
         CAST(COUNT(DISTINCT w) AS BIGINT) AS n_types
  FROM words GROUP BY source
),
bstat AS (
  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
         CAST(COUNT(DISTINCT bg) AS BIGINT) AS n_distinct_bigrams
  FROM bigrams GROUP BY source
)
SELECT w.source, w.n_tokens, w.n_types,
       ROUND(w.n_types * 1.0 / w.n_tokens, 6) AS type_token_ratio,
       b.n_bigrams, b.n_distinct_bigrams,
       ROUND(b.n_distinct_bigrams * 1.0 / b.n_bigrams, 6) AS bigram_diversity
FROM wstat w JOIN bstat b USING (source)
""",
)
def ngram_diversity_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lexical-diversity profile per source: type-token ratio and
    distinct-bigram ratio (the distinct-n diversity metric curation
    pipelines use to catch templated/spun corpora slices — low diversity
    at high volume flags machine-generated or boilerplate-heavy sources
    long before a dedup pass pays to prove it).

    Plan at 100 TB: two explodes feed source-keyed aggregates; the
    COUNT(DISTINCT) expands into Spark's two-phase partial-distinct
    aggregate (map-side dedup per partition before the shuffle), so
    shuffle volume is the per-partition distinct set, not the corpus."""
    docs = load_spread(spark, sf_dir, "documents")
    toked = docs.select(
        "source", F.filter(F.split("text", " "), lambda w: w != "").alias("toks")
    )
    words = toked.select("source", F.explode("toks").alias("w"))
    toks = F.col("toks")
    bigrams = toked.filter(F.size("toks") >= 2).select(
        "source",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.size(toks) - 2),
                lambda i: F.concat_ws(
                    " ", F.element_at(toks, i + 1), F.element_at(toks, i + 2)
                ),
            )
        ).alias("bg"),
    )
    wstat = words.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.countDistinct("w").alias("n_types"),
    )
    bstat = bigrams.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        F.countDistinct("bg").alias("n_distinct_bigrams"),
    )
    return wstat.join(bstat, "source").select(
        "source",
        "n_tokens",
        "n_types",
        F.round(F.col("n_types") * 1.0 / F.col("n_tokens"), 6).alias(
            "type_token_ratio"
        ),
        "n_bigrams",
        "n_distinct_bigrams",
        F.round(
            F.col("n_distinct_bigrams") * 1.0 / F.col("n_bigrams"), 6
        ).alias("bigram_diversity"),
    )


# ---------------------------------------------------------------------------
# Tokenizer fertility by language
# ---------------------------------------------------------------------------
@register(
    "tokenizer_fertility_stats",
    oracle="""
WITH t AS (
  SELECT lang,
         len(list_filter(string_split(text, ' '), w -> w <> '')) AS n_words,
         len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]')) AS n_toks,
         length(text) AS n_chars
  FROM documents
)
SELECT lang,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_words) AS BIGINT) AS total_words,
       CAST(SUM(n_toks) AS BIGINT) AS total_tokens,
       CAST(SUM(n_chars) AS BIGINT) AS total_chars,
       ROUND(CAST(SUM(n_toks) AS DOUBLE) / SUM(n_words), 6) AS fertility,
       ROUND(CAST(SUM(n_chars) AS DOUBLE) / SUM(n_toks), 6) AS chars_per_token
FROM t GROUP BY lang
""",
)
def tokenizer_fertility_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer fertility per language: BPE-ish tokens per whitespace word
    and characters per token — the standard audit for how evenly a
    tokenizer spends its budget across languages (high fertility = a
    language pays more tokens per word, i.e. is under-served by the
    vocabulary).  Reuses the bpe_ish_token_count pre-tokenizer regex so
    the two operators can never disagree on what a token is.

    Determinism: all sums are exact BIGINT sums of per-doc integers; the
    two ratios are single IEEE divisions of exact integers, rounded to 6
    — identical across engines by construction (no transcendentals).

    Plan at 100 TB: map-side per-doc counting (split/regexp inside
    codegen, no Python), one ≤n_langs-group partial-aggregated rollup —
    the same linear shape as token_count_stats."""
    docs = load(spark, sf_dir, "documents")
    words = F.size(F.filter(F.split("text", " "), lambda w: w != ""))
    toks = F.size(
        F.expr("regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]', 0)")
    )
    per = docs.select(
        "lang",
        words.alias("n_words"),
        toks.alias("n_toks"),
        F.length("text").alias("n_chars"),
    )
    return per.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_words").cast("bigint").alias("total_words"),
        F.sum("n_toks").cast("bigint").alias("total_tokens"),
        F.sum("n_chars").cast("bigint").alias("total_chars"),
        F.round(
            F.sum("n_toks").cast("double") / F.sum("n_words"), 6
        ).alias("fertility"),
        F.round(
            F.sum("n_chars").cast("double") / F.sum("n_toks"), 6
        ).alias("chars_per_token"),
    )


# ---------------------------------------------------------------------------
# Context-window preparation (the tokenize→chunk→pack tail of an LLM
# training-data pipeline; everything integer-exact across engines)
# ---------------------------------------------------------------------------
CTX_CHUNK = 128  # tokens per training window
CTX_STRIDE = 96  # window start step (CTX_CHUNK - 32 overlap)


@register(
    "context_window_chunks",
    oracle=f"""
WITH toked AS (
  SELECT doc_id,
         len(list_filter(string_split(text, ' '), w -> w <> '')) AS n_tok
  FROM documents
),
sized AS (
  SELECT doc_id, n_tok,
         (GREATEST(n_tok - {CTX_CHUNK}, 0) + {CTX_STRIDE} - 1) // {CTX_STRIDE} + 1
           AS n_chunks
  FROM toked WHERE n_tok >= 1
)
SELECT doc_id,
       CAST(unnest(range(0, n_chunks)) AS INT) AS chunk_idx,
       CAST(unnest(range(0, n_chunks)) * {CTX_STRIDE} AS INT) AS start_tok,
       CAST(LEAST(unnest(range(0, n_chunks)) * {CTX_STRIDE} + {CTX_CHUNK}, n_tok)
            - unnest(range(0, n_chunks)) * {CTX_STRIDE} AS INT) AS n_toks
FROM sized
""",
)
def context_window_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window chunking of every document into {CTX_CHUNK}-token
    training windows at stride {CTX_STRIDE} (32-token overlap) — the
    doc→sample expansion step before packing/batching.  The chunk COUNT
    formula is pure integer arithmetic (GREATEST + ceil-div + 1), so both
    engines enumerate identical windows; the last window is the short
    tail, never dropped (a doc shorter than one window still yields one).

    Scale: output rows ≈ tokens/stride; the expansion is a map-side
    sequence+explode off the token count — no shuffle at all until a
    downstream consumer groups."""
    docs = load_spread(spark, sf_dir, "documents")
    toks = F.filter(F.split(F.col("text"), " "), lambda w: w != "")
    sized = docs.select(
        "doc_id", F.size(toks).alias("n_tok")
    ).filter(F.col("n_tok") >= 1)
    n_chunks = (
        (F.greatest(F.col("n_tok") - CTX_CHUNK, F.lit(0)) + CTX_STRIDE - 1)
        .cast("long")
        / F.lit(CTX_STRIDE)
    ).cast("long") + 1  # exact: operands non-negative, result floors
    sized = sized.withColumn(
        "chunk_idx",
        F.explode(F.sequence(F.lit(0), (n_chunks - 1).cast("int"))),
    )
    start = F.col("chunk_idx") * CTX_STRIDE
    return sized.select(
        "doc_id",
        F.col("chunk_idx").cast("int").alias("chunk_idx"),
        start.cast("int").alias("start_tok"),
        (F.least(start + CTX_CHUNK, F.col("n_tok")) - start)
        .cast("int")
        .alias("n_toks"),
    )


PACK_C = 512  # packed context length (tokens per concatenated chunk)


@register(
    "packing_boundary_stats",
    oracle=f"""
WITH toked AS (
  SELECT doc_id,
         len(list_filter(string_split(text, ' '), w -> w <> '')) AS n_tok
  FROM documents
),
pos AS (
  SELECT doc_id, n_tok,
         SUM(n_tok) OVER (ORDER BY doc_id
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS cum
  FROM toked WHERE n_tok >= 1
),
ends AS (
  SELECT (cum - 1) // {PACK_C} AS chunk_id, COUNT(*) AS n_ends
  FROM pos GROUP BY 1
),
tot AS (
  SELECT (SUM(n_tok) + {PACK_C} - 1) // {PACK_C} AS n_chunks_total
  FROM toked WHERE n_tok >= 1
)
SELECT CAST(docs_ending_in_chunk AS INT) AS docs_ending_in_chunk,
       CAST(n_chunks AS BIGINT) AS n_chunks
FROM (
  SELECT n_ends AS docs_ending_in_chunk, COUNT(*) AS n_chunks FROM ends GROUP BY 1
  UNION ALL
  SELECT 0, (SELECT n_chunks_total FROM tot) - (SELECT COUNT(*) FROM ends)
) h
WHERE n_chunks > 0
ORDER BY docs_ending_in_chunk
""",
)
def packing_boundary_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GPT-style concat-and-chunk packing audit: documents are
    concatenated in doc_id order and cut every {PACK_C} tokens; for each
    packed chunk, how many document boundaries (doc ENDS) fall inside it —
    the histogram a pipeline owner reads to judge cross-document
    attention contamination (chunks with 0 ends are pure continuations;
    high-end chunks are confetti of short docs).

    Engine-exact: the global token cumsum runs through
    ``evaluation.ordered_running_sums`` (range-repartition + per-partition
    offsets — NO global window), chunk ids are integer floor-division,
    and the zero-ends row is derived from the exact total chunk count.

    Scale: one cumsum shuffle over doc-count rows + a chunk-keyed count;
    nothing is per-token."""
    from .evaluation import ordered_running_sums

    docs = load_spread(spark, sf_dir, "documents")
    toks = F.filter(F.split(F.col("text"), " "), lambda w: w != "")
    toked = docs.select("doc_id", F.size(toks).alias("n_tok")).filter(
        F.col("n_tok") >= 1
    )
    pos = ordered_running_sums(toked, "doc_id", ["n_tok"])
    ends = (
        pos.select(int_div(F.col("cum_n_tok") - 1, PACK_C).alias("chunk_id"))
        .groupBy("chunk_id")
        .agg(F.count(F.lit(1)).alias("n_ends"))
    ).transform(materialize)
    tot = toked.agg(
        int_div(
            dsum(F.col("n_tok")).cast("long") + PACK_C - 1, PACK_C
        ).alias("n_chunks_total")
    )
    hist = ends.groupBy(F.col("n_ends").alias("docs_ending_in_chunk")).agg(
        F.count(F.lit(1)).alias("n_chunks")
    )
    zero = (
        tot.crossJoin(F.broadcast(ends.agg(F.count(F.lit(1)).alias("n_with"))))
        .select(
            F.lit(0).alias("docs_ending_in_chunk"),
            (F.col("n_chunks_total") - F.col("n_with")).alias("n_chunks"),
        )
    )
    return (
        hist.unionByName(zero)
        .filter(F.col("n_chunks") > 0)
        .select(
            F.col("docs_ending_in_chunk").cast("int").alias("docs_ending_in_chunk"),
            F.col("n_chunks").cast("bigint").alias("n_chunks"),
        )
        .orderBy("docs_ending_in_chunk")
    )


_COVERAGE_KS = (1, 2, 4, 8, 16, 32)


def _coverage_oracle() -> str:
    legs = "\nUNION ALL\n".join(
        f"""SELECT {k} AS k,
       (SELECT CAST(SUM(n) AS BIGINT) FROM
         (SELECT n FROM c ORDER BY n DESC, word LIMIT {k}) t) AS covered_tokens
"""
        for k in _COVERAGE_KS
    )
    return f"""
WITH w AS (
  SELECT unnest(list_filter(string_split(lower(text), ' '), x -> x <> '')) AS word
  FROM documents
),
c AS (SELECT word, COUNT(*) AS n FROM w GROUP BY word),
tot AS (SELECT CAST(SUM(n) AS BIGINT) AS total_tokens FROM c),
legs AS ({legs})
SELECT k, LEAST(covered_tokens, (SELECT total_tokens FROM tot)) AS covered_tokens,
       (SELECT total_tokens FROM tot) AS total_tokens,
       ROUND(CAST(LEAST(covered_tokens, (SELECT total_tokens FROM tot)) AS DOUBLE)
             / (SELECT total_tokens FROM tot), 6) AS coverage
FROM legs ORDER BY k
"""


@register("vocab_coverage_curve", oracle=_coverage_oracle())
def vocab_coverage_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary coverage curve: the fraction of all corpus tokens
    covered by the top-k most frequent words, at k = 1,2,4,…,32 — the
    first chart a tokenizer/vocab design reads (how head-heavy is this
    corpus?).

    Plan shape: word counts aggregate once (map-side combined) into a
    materialized vocab table; each k-leg is a TakeOrdered top-k (count
    DESC, word ASC tie-break) + a scalar sum — NO global sort and NO
    unpartitioned window over the vocabulary, which can be 10⁸ rows on a
    web corpus.  The LEAST guard makes k > |vocab| legs exact."""
    docs = load_spread(spark, sf_dir, "documents")
    words = docs.select(
        # literal-space split to match the oracle tokenizer exactly
        F.explode(F.split(F.lower(F.col("text")), " ")).alias("word")
    ).filter(F.col("word") != "")
    c = materialize(
        words.groupBy("word").agg(F.count(F.lit(1)).alias("n"))
    )
    total = c.agg(F.sum("n").cast("bigint").alias("total_tokens"))
    legs = None
    for k in _COVERAGE_KS:
        leg = (
            c.orderBy(F.col("n").desc(), "word")
            .limit(k)
            .agg(F.sum("n").cast("bigint").alias("covered_tokens"))
            .select(F.lit(k).alias("k"), "covered_tokens")
        )
        legs = leg if legs is None else legs.unionByName(leg)
    return (
        legs.crossJoin(F.broadcast(total))
        .select(
            "k",
            F.least("covered_tokens", "total_tokens").alias("covered_tokens"),
            "total_tokens",
            F.round(
                F.least("covered_tokens", "total_tokens").cast("double")
                / F.col("total_tokens"),
                6,
            ).alias("coverage"),
        )
        .orderBy("k")
    )


REPEAT_N = 3  # n-gram order for intra-doc repetition
REPEAT_TOP = 50


@register(
    "intra_doc_repetition",
    oracle=f"""
WITH toked AS (
  SELECT doc_id, list_filter(string_split(text, ' '), w -> w <> '') AS t
  FROM documents
),
grams AS (
  SELECT doc_id, array_to_string(t[i:i+{REPEAT_N - 1}], ' ') AS gram
  FROM (SELECT doc_id, t, unnest(range(1, len(t) - {REPEAT_N - 2})) AS i
        FROM toked WHERE len(t) >= {REPEAT_N})
),
per_gram AS (
  SELECT doc_id, gram, COUNT(*) AS c FROM grams GROUP BY doc_id, gram
),
per_doc AS (
  SELECT doc_id,
         CAST(SUM(c) AS BIGINT) AS n_grams,
         CAST(COUNT(*) AS BIGINT) AS n_distinct,
         CAST(MAX(c) AS BIGINT) AS max_gram_count
  FROM per_gram GROUP BY doc_id
)
SELECT doc_id, n_grams, n_distinct, max_gram_count,
       ROUND(CAST(n_grams - n_distinct AS DOUBLE) / n_grams, 6) AS repeated_frac
FROM per_doc
ORDER BY repeated_frac DESC, doc_id
LIMIT {REPEAT_TOP}
""",
)
def intra_doc_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Intra-document repetition screen: per doc, the fraction of
    {REPEAT_N}-gram positions that repeat an earlier gram of the SAME doc
    (1 − distinct/total) and the single most-repeated gram's count — the
    degenerate-text signal (template loops, decoding repetition) the
    Gopher repetition rules family reads; top-{REPEAT_TOP} most
    repetitive docs surface for removal.

    Determinism: integer counts, one IEEE division rounded to 6,
    TakeOrdered tie-break by doc_id.

    Plan at 100 TB: grams explode map-side and aggregate BY (doc, gram) —
    partitioned on doc-local keys, so the shuffle is gram-count-sized and
    per-doc state never concentrates; the final TakeOrdered is top-k, no
    global sort."""
    docs = load_spread(spark, sf_dir, "documents")
    t = F.filter(F.split(F.col("text"), " "), lambda w: w != "")
    toked = docs.select("doc_id", t.alias("t")).filter(F.size("t") >= REPEAT_N)
    grams = toked.select(
        "doc_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.size("t") - (REPEAT_N - 1)),
                lambda i: F.concat_ws(" ", F.slice("t", i, REPEAT_N)),
            )
        ).alias("gram"),
    )
    per_gram = grams.groupBy("doc_id", "gram").agg(F.count(F.lit(1)).alias("c"))
    per_doc = per_gram.groupBy("doc_id").agg(
        F.sum("c").cast("bigint").alias("n_grams"),
        F.count(F.lit(1)).cast("bigint").alias("n_distinct"),
        F.max("c").cast("bigint").alias("max_gram_count"),
    )
    return (
        per_doc.select(
            "doc_id",
            "n_grams",
            "n_distinct",
            "max_gram_count",
            F.round(
                (F.col("n_grams") - F.col("n_distinct")).cast("double")
                / F.col("n_grams"),
                6,
            ).alias("repeated_frac"),
        )
        .orderBy(F.col("repeated_frac").desc(), "doc_id")
        .limit(REPEAT_TOP)
    )
