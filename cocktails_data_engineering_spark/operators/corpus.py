"""Training-corpus preparation operators: chunking, line-level boilerplate
removal, rare-token accounting, and sequence packing.

The reference stores each crawled page as one opaque text file
(``scripts/spiders/web_spider_oo.py:352-359``); a training-data pipeline
needs the next steps — splitting documents into model-sized windows,
stripping boilerplate repeated across pages, pruning noise vocabulary, and
packing documents into fixed-capacity sequences.  Everything here is pure
Catalyst (split / slice / posexplode / window / aggregate): no Python in
the hot path, every shuffle keyed on content hashes or small group keys.

Scale notes (100 TB):
- Chunking multiplies rows but is map-only (posexplode, no shuffle).
- Boilerplate detection shuffles once on line text (the CCNet shape:
  hash-partition lines, count document frequency, join back).  Line text
  is bounded (CHUNK words) so the shuffle key is small; at real scale the
  join key would be ``xxhash64(line_text)`` — we keep the raw text here
  so the DuckDB oracle stays byte-identical, and the hash variant is a
  one-line swap.
- Rare-token accounting shuffles on word (bounded by vocabulary, with
  map-side partial aggregation) and joins the exploded tokens back on
  word — both sides hash-partitioned on the same key.
- Packing uses a running sum window per source; partitions are
  independent across sources, so the window parallelizes per source and
  never materializes a global order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.numerics import int_div
from ..registry import register
from ..sources.tables import load, load_spread

# Overlapping training-window chunking: 32-token windows, stride 24
# (25% overlap), the causal-LM data-prep shape.
CHUNK_SIZE = 32
CHUNK_STRIDE = 24

# Line-level boilerplate: fixed 10-token "lines" (the fixture text has no
# newlines); a line occurring in >= BOILERPLATE_MIN_DOCS distinct documents
# is treated as template boilerplate and dropped (CCNet / RefinedWeb rule).
LINE_SIZE = 10
BOILERPLATE_MIN_DOCS = 3

# Tokens seen fewer than RARE_MIN times corpus-wide count as noise.
RARE_MIN = 3

# Sequence packing capacity (tokens per packed bin).
PACK_CAPACITY = 512

# Contamination screen: eval membership + n-gram size + flag threshold.
EVAL_MOD = 41
CONTAM_NGRAM = 5
CONTAM_FLAG_RATIO = 0.2


def _tokens(col: str = "text"):
    """Whitespace tokens with empties dropped — matches the established
    ``string_split(text, ' ')`` ↔ ``F.split(text, ' ')`` oracle parity."""
    return F.filter(F.split(col, " "), lambda w: w != "")


@register(
    "chunk_documents_stride",
    oracle=f"""
WITH toks AS (
  SELECT doc_id, list_filter(string_split(text, ' '), w -> w <> '') AS t
  FROM documents
),
starts AS (
  SELECT doc_id, t, unnest(generate_series(0, len(t) - 1, {CHUNK_STRIDE})) AS chunk_start
  FROM toks
  WHERE len(t) >= 1
)
SELECT doc_id,
       CAST(chunk_start / {CHUNK_STRIDE} AS INT) AS chunk_idx,
       CAST(chunk_start AS INT) AS chunk_start,
       CAST(len(list_slice(t, chunk_start + 1, chunk_start + {CHUNK_SIZE})) AS INT)
           AS n_chunk_tokens,
       array_to_string(list_slice(t, chunk_start + 1, chunk_start + {CHUNK_SIZE}), ' ')
           AS chunk_text
FROM starts
""",
)
def chunk_documents_stride(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Split each document into overlapping fixed-size token windows
    (size {CHUNK_SIZE}, stride {CHUNK_STRIDE}) — the training-window
    chunker.

    Scale: map-only.  ``sequence`` + ``posexplode`` expand each document
    into ~n_tokens/stride rows with no shuffle; the expansion factor is
    bounded by size/stride (≈1.33×) in tokens.
    """
    docs = load(spark, sf_dir, "documents")
    toks = docs.select("doc_id", _tokens().alias("t")).filter(F.size("t") >= 1)
    starts = toks.select(
        "doc_id",
        "t",
        F.explode(
            F.sequence(F.lit(0), F.size("t") - 1, F.lit(CHUNK_STRIDE))
        ).alias("chunk_start"),
    )
    chunk = F.slice("t", F.col("chunk_start") + 1, CHUNK_SIZE)
    return starts.select(
        "doc_id",
        (F.col("chunk_start") / CHUNK_STRIDE).cast("int").alias("chunk_idx"),
        F.col("chunk_start").cast("int"),
        F.size(chunk).cast("int").alias("n_chunk_tokens"),
        F.array_join(chunk, " ").alias("chunk_text"),
    )


@register(
    "line_dedup_boilerplate",
    oracle=f"""
WITH toks AS (
  SELECT doc_id, list_filter(string_split(text, ' '), w -> w <> '') AS t
  FROM documents
),
starts AS (
  SELECT doc_id, t, unnest(generate_series(0, len(t) - 1, {LINE_SIZE})) AS s
  FROM toks
  WHERE len(t) >= 1
),
lines AS (
  SELECT doc_id,
         CAST(s / {LINE_SIZE} AS INT) AS line_idx,
         array_to_string(list_slice(t, s + 1, s + {LINE_SIZE}), ' ') AS line_text
  FROM starts
),
freq AS (
  SELECT line_text, COUNT(DISTINCT doc_id) AS doc_freq
  FROM lines GROUP BY line_text
)
SELECT l.doc_id,
       CAST(COUNT(*) AS INT) AS n_lines,
       CAST(SUM(CASE WHEN f.doc_freq < {BOILERPLATE_MIN_DOCS} THEN 1 ELSE 0 END) AS INT)
           AS n_kept_lines,
       COALESCE(
         string_agg(
           CASE WHEN f.doc_freq < {BOILERPLATE_MIN_DOCS} THEN l.line_text END,
           ' ' ORDER BY l.line_idx),
         '') AS kept_text
FROM lines l JOIN freq f USING (line_text)
GROUP BY l.doc_id
""",
)
def line_dedup_boilerplate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Line-level boilerplate removal (CCNet/RefinedWeb rule): segment each
    document into fixed {LINE_SIZE}-token lines, drop every line that occurs
    in ≥ {BOILERPLATE_MIN_DOCS} distinct documents, and reconstruct the
    kept text in original order.

    Scale: one shuffle on line content to count document frequency
    (map-side partial aggregation applies), one hash join back on the
    same key — the same co-partitioned two-pass shape as exact dedup.
    At petabyte scale the join key becomes ``xxhash64(line_text)``; the
    raw-text key is kept here so the oracle is byte-identical.
    """
    docs = load(spark, sf_dir, "documents")
    toks = docs.select("doc_id", _tokens().alias("t")).filter(F.size("t") >= 1)
    lines = toks.select(
        "doc_id",
        F.explode(
            F.sequence(F.lit(0), F.size("t") - 1, F.lit(LINE_SIZE))
        ).alias("s"),
        "t",
    ).select(
        "doc_id",
        (F.col("s") / LINE_SIZE).cast("int").alias("line_idx"),
        F.array_join(F.slice("t", F.col("s") + 1, LINE_SIZE), " ").alias("line_text"),
    )
    freq = lines.groupBy("line_text").agg(
        F.countDistinct("doc_id").alias("doc_freq")
    )
    keep = F.col("doc_freq") < BOILERPLATE_MIN_DOCS
    kept_struct = F.when(keep, F.struct("line_idx", "line_text"))
    return (
        lines.join(freq, "line_text")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("int").alias("n_lines"),
            F.sum(keep.cast("int")).cast("int").alias("n_kept_lines"),
            # collect_list skips the NULLs when() produces for dropped lines;
            # array_sort orders by line_idx (first struct field) to restore
            # document order without a global sort.
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(kept_struct)),
                    lambda x: x.line_text,
                ),
                " ",
            ).alias("kept_text"),
        )
    )


@register(
    "rare_token_stats",
    oracle=f"""
WITH words AS (
  SELECT doc_id, unnest(list_filter(string_split(text, ' '), w -> w <> '')) AS word
  FROM documents
),
freq AS (
  SELECT word, COUNT(*) AS n FROM words GROUP BY word
)
SELECT w.doc_id,
       CAST(COUNT(*) AS INT) AS n_tokens,
       CAST(SUM(CASE WHEN f.n < {RARE_MIN} THEN 1 ELSE 0 END) AS INT) AS n_rare_tokens,
       CAST(COUNT(DISTINCT CASE WHEN f.n < {RARE_MIN} THEN w.word END) AS INT)
           AS n_rare_distinct,
       ROUND(CAST(SUM(CASE WHEN f.n < {RARE_MIN} THEN 1 ELSE 0 END) AS DOUBLE)
             / COUNT(*), 6) AS rare_ratio
FROM words w JOIN freq f USING (word)
GROUP BY w.doc_id
""",
)
def rare_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document rare-vocabulary accounting: tokens whose corpus-wide
    frequency is < {RARE_MIN} are noise; report their count / distinct
    count / ratio per document (the vocabulary-pruning signal).

    Scale: the frequency table aggregates with map-side combine (shuffle
    volume = |vocab| per task); the exploded tokens then hash-join the
    frequency table on the same key, so both shuffles co-partition on
    ``word`` and the per-doc re-aggregation combines map-side.
    """
    docs = load(spark, sf_dir, "documents")
    words = docs.select("doc_id", F.explode(_tokens()).alias("word"))
    freq = words.groupBy("word").agg(F.count(F.lit(1)).alias("n"))
    rare = F.col("n") < RARE_MIN
    return (
        words.join(freq, "word")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("int").alias("n_tokens"),
            F.sum(rare.cast("int")).cast("int").alias("n_rare_tokens"),
            F.countDistinct(F.when(rare, F.col("word"))).cast("int").alias(
                "n_rare_distinct"
            ),
            F.round(
                F.sum(rare.cast("int")).cast("double") / F.count(F.lit(1)), 6
            ).alias("rare_ratio"),
        )
    )


@register(
    "pack_sequences_bins",
    oracle=f"""
WITH sized AS (
  SELECT source, doc_id,
         len(list_filter(string_split(text, ' '), w -> w <> '')) AS n_tokens
  FROM documents
),
binned AS (
  SELECT source, doc_id, n_tokens,
         CAST((SUM(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
                                   ROWS UNBOUNDED PRECEDING) - 1)
              // {PACK_CAPACITY} AS INT) AS bin_id
  FROM sized
)
SELECT source, bin_id,
       CAST(COUNT(*) AS INT) AS n_docs,
       CAST(SUM(n_tokens) AS BIGINT) AS sum_tokens,
       MIN(doc_id) AS first_doc,
       MAX(doc_id) AS last_doc
FROM binned
GROUP BY source, bin_id
""",
)
def pack_sequences_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing (contiguous-fill approximation): within each
    source, stream documents in doc_id order and cut a new bin whenever
    the running token count crosses {PACK_CAPACITY} — the deterministic,
    order-preserving stand-in for greedy bin packing (which is inherently
    sequential and not worth a global order at scale).

    Scale: the running-sum window partitions by ``source``, so sources
    pack independently in parallel and no global ordering exists; the
    final per-bin rollup combines map-side.
    """
    docs = load(spark, sf_dir, "documents")
    sized = docs.select(
        "source", "doc_id", F.size(_tokens()).alias("n_tokens")
    )
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # Explicit integral floor division: DuckDB CAST(double AS INT)
    # rounds-to-nearest while Spark's cast truncates, and double division
    # is only boundary-exact for cooperative divisors — int_div sidesteps
    # both.
    binned = sized.withColumn(
        "bin_id",
        int_div(F.sum("n_tokens").over(w) - 1, PACK_CAPACITY).cast("int"),
    )
    return binned.groupBy("source", "bin_id").agg(
        F.count(F.lit(1)).cast("int").alias("n_docs"),
        F.sum("n_tokens").cast("bigint").alias("sum_tokens"),
        F.min("doc_id").alias("first_doc"),
        F.max("doc_id").alias("last_doc"),
    )


# ---------------------------------------------------------------------------
# Eval-set contamination screen (train/test n-gram overlap)
# ---------------------------------------------------------------------------
@register(
    "eval_contamination_overlap",
    oracle=f"""
WITH toks AS (
  SELECT doc_id, list_filter(string_split(text, ' '), w -> w <> '') AS t
  FROM documents
),
grams AS (
  SELECT doc_id, unnest(list_distinct(
           list_transform(range(1, len(t) - {CONTAM_NGRAM - 2}),
             i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2] || ' ' || t[i+3] || ' ' || t[i+4])
         )) AS gram
  FROM toks WHERE len(t) >= {CONTAM_NGRAM}
),
train_grams AS (
  SELECT DISTINCT gram FROM grams WHERE doc_id % {EVAL_MOD} <> 0
),
eval_hits AS (
  SELECT g.doc_id, g.gram, CASE WHEN tg.gram IS NULL THEN 0 ELSE 1 END AS hit
  FROM grams g LEFT JOIN train_grams tg USING (gram)
  WHERE g.doc_id % {EVAL_MOD} = 0
)
SELECT doc_id,
       CAST(COUNT(*) AS INT) AS n_ngrams,
       CAST(SUM(hit) AS INT) AS n_overlapping,
       ROUND(CAST(SUM(hit) AS DOUBLE) / COUNT(*), 6) AS overlap_ratio,
       CAST(CASE WHEN CAST(SUM(hit) AS DOUBLE) / COUNT(*) >= {CONTAM_FLAG_RATIO}
            THEN 1 ELSE 0 END AS INT) AS is_contaminated
FROM eval_hits GROUP BY doc_id
""",
)
def eval_contamination_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train/eval contamination screen: every {CONTAM_NGRAM}-token n-gram of
    each EVAL document (``doc_id % {EVAL_MOD} = 0``) is probed against the
    distinct n-gram set of the TRAIN split; eval documents whose overlap
    ratio reaches {CONTAM_FLAG_RATIO} are flagged — the decontamination
    gate every benchmark-clean training corpus needs.

    Scale: the train n-gram set is distinct-aggregated FIRST (map-side
    combine collapses within-partition repeats), then the probe is one
    hash join co-partitioned on the n-gram; at petabyte scale the join
    key becomes ``xxhash64(gram)`` (the raw text key keeps the DuckDB
    oracle byte-identical).  The eval side is a tiny fraction of the
    corpus by construction, so the join's streamed side is the train set
    and the per-doc rollup is metadata-sized.
    """
    docs = load(spark, sf_dir, "documents")
    toked = docs.select("doc_id", _tokens().alias("t")).filter(
        F.size("t") >= CONTAM_NGRAM
    )
    t = F.col("t")
    grams_arr = F.array_distinct(
        F.transform(
            F.sequence(F.lit(0), F.size(t) - CONTAM_NGRAM),
            lambda i: F.concat_ws(
                " ", *[F.element_at(t, i + k + 1) for k in range(CONTAM_NGRAM)]
            ),
        )
    )
    grams = toked.select("doc_id", F.explode(grams_arr).alias("gram"))
    is_eval = F.col("doc_id") % EVAL_MOD == 0
    train_grams = grams.filter(~is_eval).select("gram").distinct()
    tg = train_grams.withColumn("hit", F.lit(1))
    hits = (
        grams.filter(is_eval)
        .join(tg, "gram", "left")
        .select("doc_id", F.coalesce("hit", F.lit(0)).alias("hit"))
    )
    ratio = F.sum("hit").cast("double") / F.count(F.lit(1))
    return hits.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("int").alias("n_ngrams"),
        F.sum("hit").cast("int").alias("n_overlapping"),
        F.round(ratio, 6).alias("overlap_ratio"),
        F.when(ratio >= CONTAM_FLAG_RATIO, 1).otherwise(0).cast("int").alias(
            "is_contaminated"
        ),
    )


# ---------------------------------------------------------------------------
# Within-document repetition (duplicate-line fraction)
# ---------------------------------------------------------------------------
@register(
    "doc_repetition_stats",
    oracle=f"""
WITH toks AS (
  SELECT doc_id, list_filter(string_split(text, ' '), w -> w <> '') AS t
  FROM documents
),
lines AS (
  SELECT doc_id,
         array_to_string(list_slice(t, s + 1, s + {LINE_SIZE}), ' ') AS line_text
  FROM (SELECT doc_id, t, unnest(generate_series(0, len(t) - 1, {LINE_SIZE})) AS s
        FROM toks WHERE len(t) >= 1)
),
per_line AS (
  SELECT doc_id, line_text, COUNT(*) AS n FROM lines GROUP BY doc_id, line_text
)
SELECT doc_id,
       CAST(SUM(n) AS INT) AS n_lines,
       CAST(COUNT(*) AS INT) AS n_distinct_lines,
       ROUND(1.0 - CAST(COUNT(*) AS DOUBLE) / SUM(n), 6) AS dup_line_ratio,
       CAST(MAX(n) AS INT) AS top_line_repeats
FROM per_line GROUP BY doc_id
""",
)
def doc_repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Within-document repetition audit (the RefinedWeb/MassiveText
    duplicate-line fraction): segment each document into fixed
    {LINE_SIZE}-token lines and report how many lines are repeats of an
    earlier line in the SAME document — high ratios indicate templated or
    looping text that inflates a training corpus.

    Scale: both aggregations key on ``doc_id`` (first with ``line_text``
    appended), so the second is a map-side-combinable rollup of the first
    with no reshuffle — one shuffle total, partitioned by document.
    """
    docs = load(spark, sf_dir, "documents")
    toked = docs.select("doc_id", _tokens().alias("t")).filter(F.size("t") >= 1)
    lines = toked.select(
        "doc_id",
        F.explode(
            F.sequence(F.lit(0), F.size("t") - 1, F.lit(LINE_SIZE))
        ).alias("s"),
        "t",
    ).select(
        "doc_id",
        F.array_join(F.slice("t", F.col("s") + 1, LINE_SIZE), " ").alias("line_text"),
    )
    per_line = lines.groupBy("doc_id", "line_text").agg(
        F.count(F.lit(1)).alias("n")
    )
    return per_line.groupBy("doc_id").agg(
        F.sum("n").cast("int").alias("n_lines"),
        F.count(F.lit(1)).cast("int").alias("n_distinct_lines"),
        F.round(
            F.lit(1.0) - F.count(F.lit(1)).cast("double") / F.sum("n"), 6
        ).alias("dup_line_ratio"),
        F.max("n").cast("int").alias("top_line_repeats"),
    )


# ---------------------------------------------------------------------------
# PII scrubbing accounting
# ---------------------------------------------------------------------------
_EMAIL_RE = "[a-z0-9]+@[a-z0-9.]+[a-z]"
_PHONE_RE = "[0-9]+-[0-9]+"


@register(
    "pii_scrub_stats",
    oracle=f"""
WITH aug AS (
  SELECT source,
         text || ' contact user' || CAST(doc_id AS VARCHAR)
              || '@example.com or call 0' || CAST(doc_id % 10 AS VARCHAR)
              || '-' || lpad(CAST((doc_id * 7) % 10000 AS VARCHAR), 4, '0') AS text
  FROM documents
),
scrubbed AS (
  SELECT source, text,
         len(regexp_extract_all(text, '{_EMAIL_RE}')) AS n_emails,
         len(regexp_extract_all(text, '{_PHONE_RE}')) AS n_phones,
         regexp_replace(regexp_replace(text, '{_EMAIL_RE}', '<EMAIL>', 'g'),
                        '{_PHONE_RE}', '<PHONE>', 'g') AS clean
  FROM aug
)
SELECT source,
       CAST(COUNT(*) AS INT) AS n_docs,
       CAST(SUM(n_emails) AS INT) AS total_emails,
       CAST(SUM(n_phones) AS INT) AS total_phones,
       CAST(SUM(length(text)) AS BIGINT) AS chars_in,
       CAST(SUM(length(clean)) AS BIGINT) AS chars_out
FROM scrubbed GROUP BY source
""",
)
def pii_scrub_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrubbing accounting: count and redact email- and phone-shaped
    spans per source, reporting before/after character volumes — the
    audit trail a compliance-scrubbed corpus release needs.  The fixture
    text contains no PII, so a deterministic synthetic contact line is
    appended to every document first (same union-in-known-bad pattern as
    ``json_parse_robustness``) and the oracle builds the identical line.

    Scale: map-only regex work (JVM codegen, no Python) followed by one
    metadata-sized rollup per source; regex cost is linear in bytes and
    embarrassingly parallel.
    """
    docs = load(spark, sf_dir, "documents")
    aug = docs.select(
        "source",
        F.concat(
            F.col("text"),
            F.lit(" contact user"),
            F.col("doc_id").cast("string"),
            F.lit("@example.com or call 0"),
            (F.col("doc_id") % 10).cast("string"),
            F.lit("-"),
            F.lpad(((F.col("doc_id") * 7) % 10000).cast("string"), 4, "0"),
        ).alias("text"),
    )
    scrubbed = aug.select(
        "source",
        "text",
        F.size(F.regexp_extract_all("text", F.lit(_EMAIL_RE), 0)).alias("n_emails"),
        F.size(F.regexp_extract_all("text", F.lit(_PHONE_RE), 0)).alias("n_phones"),
        F.regexp_replace(
            F.regexp_replace("text", _EMAIL_RE, "<EMAIL>"), _PHONE_RE, "<PHONE>"
        ).alias("clean"),
    )
    return scrubbed.groupBy("source").agg(
        F.count(F.lit(1)).cast("int").alias("n_docs"),
        F.sum("n_emails").cast("int").alias("total_emails"),
        F.sum("n_phones").cast("int").alias("total_phones"),
        F.sum(F.length("text")).cast("bigint").alias("chars_in"),
        F.sum(F.length("clean")).cast("bigint").alias("chars_out"),
    )


# ---------------------------------------------------------------------------
# Python UDTF twin of the chunker (Spark 4 user-defined TABLE function)
# ---------------------------------------------------------------------------
@F.udtf(
    returnType="chunk_idx INT, chunk_start INT, n_chunk_tokens INT, chunk_text STRING",
    useArrow=True,
)
class _ChunkUDTF:
    """One row in → chunks out: the UDTF contract (a table function a SQL
    user calls in LATERAL position).  Arrow-optimized transfer."""

    def eval(self, text: str):  # noqa: A002 - UDTF API signature
        toks = [w for w in (text or "").split(" ") if w != ""]
        for idx, start in enumerate(range(0, len(toks), CHUNK_STRIDE)):
            window = toks[start : start + CHUNK_SIZE]
            yield idx, start, len(window), " ".join(window)


@register(
    "udtf_chunk_expand",
    oracle=f"""
WITH toks AS (
  SELECT doc_id, list_filter(string_split(text, ' '), w -> w <> '') AS t
  FROM documents
),
starts AS (
  SELECT doc_id, t,
         unnest(generate_series(0, len(t) - 1, {CHUNK_STRIDE})) AS chunk_start
  FROM toks WHERE len(t) >= 1
)
SELECT doc_id,
       CAST(chunk_start / {CHUNK_STRIDE} AS INT) AS chunk_idx,
       CAST(chunk_start AS INT) AS chunk_start,
       CAST(len(list_slice(t, chunk_start + 1, chunk_start + {CHUNK_SIZE})) AS INT)
           AS n_chunk_tokens,
       array_to_string(list_slice(t, chunk_start + 1, chunk_start + {CHUNK_SIZE}), ' ')
           AS chunk_text
FROM starts
""",
)
def udtf_chunk_expand(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The stride chunker as a Python USER-DEFINED TABLE FUNCTION —
    Spark 4's mechanism for custom row-expanding operators callable
    from SQL (`LATERAL _chunk(text)`), here Arrow-optimized and
    oracle-checked against the same arithmetic as the pure-Catalyst
    ``chunk_documents_stride``.  Two implementations, one oracle: the
    UDTF path is for logic that genuinely cannot be expressed with
    sequence/slice (a real tokenizer, a sentence splitter); the
    built-in path remains the fast default — the parity proves the seam
    is drop-in.

    Plan: map-only expansion (ArrowEvalPythonUDTF), no shuffle; the
    expansion factor is bounded by size/stride like the built-in twin."""
    docs = load_spread(spark, sf_dir, "documents").filter(
        F.size(_tokens()) >= 1
    )
    return docs.lateralJoin(
        _ChunkUDTF(F.col("text").outer())
    ).select("doc_id", "chunk_idx", "chunk_start", "n_chunk_tokens", "chunk_text")


# ---------------------------------------------------------------------------
# Gopher-style quality rules (Rae et al. 2021, "Scaling Language Models",
# Appendix A1.1): per-document repetition-free heuristic filters, reported
# as a per-language rule scorecard.
# ---------------------------------------------------------------------------
GOPHER_MIN_WORDS, GOPHER_MAX_WORDS = 50, 100_000
GOPHER_MWL_MIN, GOPHER_MWL_MAX = 3, 10  # mean word length bounds (integers!)
GOPHER_ALPHA_NUM, GOPHER_ALPHA_DEN = 4, 5  # >= 80% of words must have a letter
GOPHER_MIN_STOPWORDS = 2
GOPHER_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")


@register(
    "gopher_quality_rules",
    oracle=f"""
WITH t AS (
  SELECT lang,
         list_filter(string_split(lower(text), ' '), w -> w <> '') AS ws
  FROM documents
),
d AS (
  SELECT lang,
         len(ws) AS nw,
         CAST(list_sum(list_transform(ws, w -> length(w))) AS BIGINT) AS sum_len,
         len(list_filter(ws, w -> regexp_matches(w, '[a-z]'))) AS alpha_w,
         len(list_filter(ws, w -> list_contains({list(GOPHER_STOPWORDS)!r}, w)))
           AS stop_w
  FROM t
),
f AS (
  SELECT lang,
    CASE WHEN nw < {GOPHER_MIN_WORDS} OR nw > {GOPHER_MAX_WORDS}
         THEN 1 ELSE 0 END AS r_words,
    CASE WHEN sum_len < {GOPHER_MWL_MIN} * nw OR sum_len > {GOPHER_MWL_MAX} * nw
         THEN 1 ELSE 0 END AS r_mwl,
    CASE WHEN alpha_w * {GOPHER_ALPHA_DEN} < nw * {GOPHER_ALPHA_NUM}
         THEN 1 ELSE 0 END AS r_alpha,
    CASE WHEN stop_w < {GOPHER_MIN_STOPWORDS} THEN 1 ELSE 0 END AS r_stop
  FROM d
)
SELECT lang,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(r_words) AS BIGINT) AS flagged_word_count,
       CAST(SUM(r_mwl) AS BIGINT) AS flagged_mean_word_len,
       CAST(SUM(r_alpha) AS BIGINT) AS flagged_alpha_ratio,
       CAST(SUM(r_stop) AS BIGINT) AS flagged_stopwords,
       CAST(SUM(CASE WHEN r_words + r_mwl + r_alpha + r_stop = 0
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_pass
FROM f GROUP BY lang ORDER BY lang
""",
)
def gopher_quality_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style document quality scorecard: per language, how many
    documents trip each heuristic rule (word-count bounds, mean word
    length bounds, alphabetic-word ratio, minimum stop-word hits) and
    how many pass all four — the first gate of a pre-training corpus.

    Every rule threshold compares INTEGERS (``sum_len < 3*nw`` instead
    of ``sum_len/nw < 3.0``; ``alpha*5 < nw*4`` instead of ``< 0.8``),
    so the oracle agrees bit-for-bit with no float epsilon anywhere.

    Scale: the per-document rule evaluation is map-only higher-order
    functions (filter/aggregate over the split array, all JVM-side);
    the only shuffle is the final tiny groupBy(lang) with map-side
    combine.  At 100 TB this is a single pass over the text column.
    """
    docs = load_spread(spark, sf_dir, "documents")
    ws = F.filter(F.split(F.lower("text"), " "), lambda w: w != "")
    d = docs.select(
        "lang",
        F.size(ws).cast("long").alias("nw"),
        F.aggregate(
            ws, F.lit(0).cast("long"), lambda acc, w: acc + F.length(w)
        ).alias("sum_len"),
        F.size(F.filter(ws, lambda w: w.rlike("[a-z]"))).cast("long").alias("alpha_w"),
        F.size(F.filter(ws, lambda w: w.isin(*GOPHER_STOPWORDS)))
        .cast("long")
        .alias("stop_w"),
    )
    r = d.select(
        "lang",
        F.when(
            (F.col("nw") < GOPHER_MIN_WORDS) | (F.col("nw") > GOPHER_MAX_WORDS), 1
        )
        .otherwise(0)
        .alias("r_words"),
        F.when(
            (F.col("sum_len") < GOPHER_MWL_MIN * F.col("nw"))
            | (F.col("sum_len") > GOPHER_MWL_MAX * F.col("nw")),
            1,
        )
        .otherwise(0)
        .alias("r_mwl"),
        F.when(F.col("alpha_w") * GOPHER_ALPHA_DEN < F.col("nw") * GOPHER_ALPHA_NUM, 1)
        .otherwise(0)
        .alias("r_alpha"),
        F.when(F.col("stop_w") < GOPHER_MIN_STOPWORDS, 1).otherwise(0).alias("r_stop"),
    )
    return (
        r.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.col("r_words").cast("long")).alias("flagged_word_count"),
            F.sum(F.col("r_mwl").cast("long")).alias("flagged_mean_word_len"),
            F.sum(F.col("r_alpha").cast("long")).alias("flagged_alpha_ratio"),
            F.sum(F.col("r_stop").cast("long")).alias("flagged_stopwords"),
            F.sum(
                F.when(
                    F.col("r_words") + F.col("r_mwl") + F.col("r_alpha") + F.col("r_stop")
                    == 0,
                    1,
                )
                .otherwise(0)
                .cast("long")
            ).alias("n_pass"),
        )
        .orderBy("lang")
    )


# ---------------------------------------------------------------------------
# Epoch shuffle plan: deterministic per-epoch shard orders, independence audit
# ---------------------------------------------------------------------------
SHUFFLE_SHARDS_MOD = 64
SHUFFLE_EPOCHS = 3


@register(
    "shard_shuffle_epoch_plan",
    oracle=f"""
WITH shards AS (
  SELECT DISTINCT doc_id % {SHUFFLE_SHARDS_MOD} AS shard_id FROM documents
),
epochs AS (SELECT unnest(range(0, {SHUFFLE_EPOCHS})) AS epoch),
ranked AS (
  SELECT e.epoch, s.shard_id,
         CAST(ROW_NUMBER() OVER (
           PARTITION BY e.epoch
           ORDER BY md5(CAST(e.epoch AS VARCHAR) || ':' ||
                        CAST(s.shard_id AS VARCHAR)), s.shard_id
         ) AS BIGINT) AS rk
  FROM shards s CROSS JOIN epochs e
),
pairs AS (
  SELECT a.epoch AS epoch_a, b.epoch AS epoch_b,
         CAST(COUNT(*) AS BIGINT) AS n_shards,
         CAST(SUM((a.rk - b.rk) * (a.rk - b.rk)) AS BIGINT) AS d2
  FROM ranked a JOIN ranked b
    ON a.shard_id = b.shard_id AND a.epoch < b.epoch
  GROUP BY a.epoch, b.epoch
)
SELECT epoch_a, epoch_b, n_shards,
       ROUND(1 - CAST(6 * d2 AS DOUBLE)
                 / (n_shards * (n_shards * n_shards - 1)), 6) AS spearman_rho
FROM pairs ORDER BY epoch_a, epoch_b
""",
)
def shard_shuffle_epoch_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dataloader epoch-shuffle plan + independence audit: each training
    epoch orders the corpus shards by a DETERMINISTIC seeded hash
    (md5(epoch:shard) — reproducible on any cluster, no RNG state to
    ship), and the audit reports the Spearman rank correlation between
    every epoch pair.  Near-zero rho certifies the epochs traverse the
    shards in effectively independent orders — the property that keeps
    gradient noise decorrelated across epochs; a dataloader whose
    "shuffle" correlates across epochs quietly re-feeds batches in the
    same neighborhoods.

    Determinism end-to-end: ranks are integers from an md5 total order
    (shard-id tiebreak), d² sums are exact bigints, and rho is one IEEE
    division rounded to 6 — both engines agree bit-for-bit.

    Plan at 100 TB: the shard list is a distinct projection (shards ≪
    corpus); ranking and the pairwise join run over |shards|×|epochs|
    rows — metadata-sized regardless of corpus bytes."""
    shards = (
        load(spark, sf_dir, "documents")
        .select((F.col("doc_id") % SHUFFLE_SHARDS_MOD).alias("shard_id"))
        .distinct()
    )
    epochs = spark.range(SHUFFLE_EPOCHS).select(F.col("id").alias("epoch"))
    w = Window.partitionBy("epoch").orderBy(
        F.md5(
            F.concat(
                F.col("epoch").cast("string"),
                F.lit(":"),
                F.col("shard_id").cast("string"),
            )
        ),
        "shard_id",
    )
    ranked = shards.crossJoin(F.broadcast(epochs)).select(
        "epoch", "shard_id", F.row_number().over(w).cast("bigint").alias("rk")
    )
    a = ranked.select(
        F.col("epoch").alias("epoch_a"), "shard_id", F.col("rk").alias("rk_a")
    )
    b = ranked.select(
        F.col("epoch").alias("epoch_b"), "shard_id", F.col("rk").alias("rk_b")
    )
    pairs = (
        a.join(b, "shard_id")
        .filter(F.col("epoch_a") < F.col("epoch_b"))
        .groupBy("epoch_a", "epoch_b")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_shards"),
            F.sum(
                (F.col("rk_a") - F.col("rk_b")) * (F.col("rk_a") - F.col("rk_b"))
            )
            .cast("bigint")
            .alias("d2"),
        )
    )
    return pairs.select(
        "epoch_a",
        "epoch_b",
        "n_shards",
        F.round(
            F.lit(1)
            - (F.lit(6) * F.col("d2")).cast("double")
            / (
                F.col("n_shards")
                * (F.col("n_shards") * F.col("n_shards") - 1)
            ),
            6,
        ).alias("spearman_rho"),
    ).orderBy("epoch_a", "epoch_b")
