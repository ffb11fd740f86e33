"""Deduplication operators over the documents table (north-star extension).

Four families, each the standard shape used in large-scale training-data
pipelines:

- **exact**: hash-groupBy on the full text (canonical-representative = min id)
- **MinHash + LSH**: word-3-shingles → 8 minhashes → 4 bands of 2 → candidate
  pairs share a band bucket.  The minhash is the *lexicographic minimum of
  md5(seed || shingle)* — md5 is available and bit-identical in Spark and
  DuckDB, which makes the whole pipeline oracle-checkable (no engine-specific
  hash functions).
- **SimHash**: 16-bit signature from per-token md5 bits, banded 4×4 for the
  pigeonhole prefilter (hamming ≤ 3 ⇒ at least one band equal), then exact
  hamming verification with xor + bit_count.
- **n-gram Jaccard**: exact shingle-set Jaccard via a shingle-bucket
  self-join — the verification stage LSH candidates feed at scale.

Scale notes: every stage is explode → shuffle-on-key → aggregate; the only
quadratic step is *within a bucket* (band bucket or shingle bucket), which
is the point of LSH — bucket sizes stay bounded as the corpus grows.  At
100 TB, add a salt to hot band buckets (identical boilerplate docs) before
the self-join; AQE's skew-join handles moderate skew automatically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ..sources.tables import load

N_HASHES = 8
BAND_SIZE = 2  # 4 bands of 2 minhashes


# ---------------------------------------------------------------------------
# Shared shingle / token fragments (Spark side + DuckDB twin)
# ---------------------------------------------------------------------------
def _tokens_col():
    return F.filter(F.split("text", " "), lambda w: w != "")


def _shingles(df: DataFrame) -> DataFrame:
    """(doc_id, shingle) — distinct word-3-shingles per document."""
    toks = _tokens_col()
    shingles = F.array_distinct(
        F.transform(
            F.sequence(F.lit(0), F.size(toks) - 3),
            lambda i: F.concat_ws(
                " ",
                F.element_at(toks, i + 1),
                F.element_at(toks, i + 2),
                F.element_at(toks, i + 3),
            ),
        )
    )
    return (
        df.filter(F.size(toks) >= 3)
        .select("doc_id", F.explode(shingles).alias("shingle"))
    )


# DuckDB twin of _shingles (1-indexed lists; range(a,b) is end-exclusive).
_ORACLE_SHINGLES = """
SELECT doc_id, unnest(list_distinct(
         list_transform(range(1, len(toks) - 1),
                        i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])
       )) AS shingle
FROM (SELECT doc_id, list_filter(string_split(text, ' '), w -> w <> '') AS toks
      FROM documents)
WHERE len(toks) >= 3
"""


# ---------------------------------------------------------------------------
# Exact dedup
# ---------------------------------------------------------------------------
@register(
    "exact_dedup_docs",
    oracle="""
SELECT MIN(doc_id) AS doc_id, COUNT(*) AS n_copies, MIN(source) AS first_source
FROM documents
GROUP BY text
""",
)
def exact_dedup_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact deduplication: one canonical row (min doc_id) per distinct text.

    Deterministic replacement for dropDuplicates(["text"]) (which keeps an
    arbitrary row).  Scale: single hash-shuffle on the text; for very long
    documents group by md5(text) instead so the shuffle key is 32 bytes —
    same plan shape.
    """
    return (
        load(spark, sf_dir, "documents")
        .groupBy("text")
        .agg(
            F.min("doc_id").alias("doc_id"),
            F.count(F.lit(1)).alias("n_copies"),
            F.min("source").alias("first_source"),
        )
        .select("doc_id", "n_copies", "first_source")
    )


@register(
    "exact_dedup_by_fingerprint",
    oracle="""
SELECT fingerprint, MIN(doc_id) AS doc_id, COUNT(*) AS n_copies
FROM (
  SELECT doc_id, md5(lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))) AS fingerprint
  FROM documents
) t
GROUP BY fingerprint
""",
)
def exact_dedup_by_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup on the normalized fingerprint (32-byte shuffle key) —
    the at-scale variant of exact_dedup_docs."""
    docs = load(spark, sf_dir, "documents")
    fp = F.md5(F.lower(F.trim(F.regexp_replace("text", r"\s+", " "))))
    return (
        docs.select("doc_id", fp.alias("fingerprint"))
        .groupBy("fingerprint")
        .agg(F.min("doc_id").alias("doc_id"), F.count(F.lit(1)).alias("n_copies"))
    )


# ---------------------------------------------------------------------------
# MinHash + LSH banding
# ---------------------------------------------------------------------------
@register(
    "minhash_near_dedup",
    oracle=f"""
WITH shingled AS ({_ORACLE_SHINGLES}),
hashed AS (
  SELECT doc_id, seed, MIN(md5(CAST(seed AS VARCHAR) || '|' || shingle)) AS h
  FROM shingled, (SELECT unnest(range(0, {N_HASHES})) AS seed)
  GROUP BY doc_id, seed
),
bands AS (
  SELECT doc_id, seed // {BAND_SIZE} AS band_id,
         MAX(CASE WHEN seed % {BAND_SIZE} = 0 THEN h END) ||
         MAX(CASE WHEN seed % {BAND_SIZE} = 1 THEN h END) AS band_key
  FROM hashed
  GROUP BY doc_id, seed // {BAND_SIZE}
)
SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
FROM bands a JOIN bands b
  ON a.band_id = b.band_id AND a.band_key = b.band_key AND a.doc_id < b.doc_id
""",
)
def minhash_near_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-LSH near-duplicate candidates: 8 md5-minhashes over word-3-
    shingles, banded 4×2; pairs sharing any band bucket are candidates.

    Scale: no all-pairs step anywhere — the self-join is on (band_id,
    band_key), so cost is Σ bucket². Signature build is explode + 8-way
    seed fan-out + min-aggregate: shuffle volume 8 rows/doc.
    """
    docs = load(spark, sf_dir, "documents")
    shingled = _shingles(docs)
    seeds = spark.range(N_HASHES).select(F.col("id").cast("int").alias("seed"))
    hashed = (
        shingled.crossJoin(F.broadcast(seeds))
        .select(
            "doc_id",
            "seed",
            F.md5(F.concat(F.col("seed").cast("string"), F.lit("|"), F.col("shingle"))).alias(
                "h"
            ),
        )
        .groupBy("doc_id", "seed")
        .agg(F.min("h").alias("h"))
    )
    bands = (
        hashed.withColumn("band_id", (F.col("seed") / BAND_SIZE).cast("int"))
        .groupBy("doc_id", "band_id")
        .agg(
            F.concat(
                F.max(F.when(F.col("seed") % BAND_SIZE == 0, F.col("h"))),
                F.max(F.when(F.col("seed") % BAND_SIZE == 1, F.col("h"))),
            ).alias("band_key")
        )
    )
    a = bands.alias("a")
    b = bands.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )


# ---------------------------------------------------------------------------
# n-gram Jaccard (exact verification)
# ---------------------------------------------------------------------------
JACCARD_MIN = 0.03


@register(
    "ngram_jaccard_dedup",
    oracle=f"""
WITH shingled AS ({_ORACLE_SHINGLES}),
counts AS (SELECT doc_id, COUNT(*) AS n_sh FROM shingled GROUP BY doc_id),
common AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_common
  FROM shingled a JOIN shingled b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
)
SELECT doc_a, doc_b, n_common,
       CAST(n_common AS DOUBLE) / (ca.n_sh + cb.n_sh - n_common) AS jaccard
FROM common
JOIN counts ca ON ca.doc_id = doc_a
JOIN counts cb ON cb.doc_id = doc_b
WHERE CAST(n_common AS DOUBLE) / (ca.n_sh + cb.n_sh - n_common) >= {JACCARD_MIN}
""",
)
def ngram_jaccard_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact 3-shingle Jaccard similarity for pairs sharing ≥1 shingle.

    Scale: the self-join is bucketed by shingle, so cost is Σ(docs-per-
    shingle)² — bounded for natural text; at 100 TB run it only on LSH
    candidates (minhash_near_dedup) and drop stop-shingles (df > cap).
    The Jaccard itself is int/int division — exact across engines.
    """
    shingled = _shingles(load(spark, sf_dir, "documents"))
    counts = shingled.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    a = shingled.alias("a")
    b = shingled.alias("b")
    common = (
        a.join(
            b,
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    ca = counts.alias("ca")
    cb = counts.alias("cb")
    jac = F.col("n_common").cast("double") / (
        F.col("ca.n_sh") + F.col("cb.n_sh") - F.col("n_common")
    )
    return (
        common.join(ca, F.col("ca.doc_id") == F.col("doc_a"))
        .join(cb, F.col("cb.doc_id") == F.col("doc_b"))
        .filter(jac >= JACCARD_MIN)
        .select("doc_a", "doc_b", "n_common", jac.alias("jaccard"))
    )


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------
SIMHASH_BITS = 16
SIMHASH_BAND_BITS = 4
HAMMING_MAX = 3

# Portable hex→int for the first 4 md5 hex chars (16 bits): both engines
# index the char in a constant hex alphabet.  DuckDB twin below.
_HEX = "0123456789abcdef"


def _hex16(col):
    """First 16 bits of md5(col) as an int, via alphabet indexing —
    identical in any engine with strpos/instr (no conv() dependency)."""
    h = F.md5(col)
    parts = [
        (F.instr(F.lit(_HEX), F.substring(h, i + 1, 1)) - 1) * (16 ** (3 - i))
        for i in range(4)
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out + p
    return out


_ORACLE_HEX16 = (
    "((strpos('{hx}', substr(md5(word), 1, 1)) - 1) * 4096 + "
    "(strpos('{hx}', substr(md5(word), 2, 1)) - 1) * 256 + "
    "(strpos('{hx}', substr(md5(word), 3, 1)) - 1) * 16 + "
    "(strpos('{hx}', substr(md5(word), 4, 1)) - 1))"
).format(hx=_HEX)


@register(
    "simhash_dedup",
    oracle=f"""
WITH toks AS (
  SELECT doc_id, unnest(list_filter(string_split(text, ' '), w -> w <> '')) AS word
  FROM documents
),
hashed AS (SELECT doc_id, {_ORACLE_HEX16} AS hv FROM toks),
bits AS (
  SELECT doc_id, b,
         CASE WHEN SUM(CASE WHEN (hv >> b) & 1 = 1 THEN 1 ELSE -1 END) >= 0
              THEN 1 ELSE 0 END AS bit
  FROM hashed, (SELECT unnest(range(0, {SIMHASH_BITS})) AS b)
  GROUP BY doc_id, b
),
sigs AS (SELECT doc_id, CAST(SUM(bit << b) AS BIGINT) AS simhash FROM bits GROUP BY doc_id),
bands AS (
  SELECT doc_id, simhash, band,
         (simhash >> (band * {SIMHASH_BAND_BITS})) & {2**SIMHASH_BAND_BITS - 1} AS band_val
  FROM sigs, (SELECT unnest(range(0, {SIMHASH_BITS // SIMHASH_BAND_BITS})) AS band)
)
SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
       CAST(bit_count(xor(a.simhash, b.simhash)) AS INT) AS hamming
FROM bands a JOIN bands b
  ON a.band = b.band AND a.band_val = b.band_val AND a.doc_id < b.doc_id
WHERE bit_count(xor(a.simhash, b.simhash)) <= {HAMMING_MAX}
""",
)
def simhash_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dedup: 16-bit token-frequency simhash, 4×4-bit band
    prefilter (pigeonhole: hamming ≤ 3 ⇒ some band equal), exact hamming
    via xor + bit_count.

    Scale: signature build is one explode + two aggregations; the pair
    join is band-bucketed.  Production simhash uses 64 bits — the 16-bit
    width here keeps the oracle's integers small while exercising the
    identical plan.
    """
    docs = load(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.explode(F.filter(F.split("text", " "), lambda w: w != "")).alias("word")
    )
    hashed = toks.select("doc_id", _hex16(F.col("word")).alias("hv"))
    bits_range = (
        hashed.sparkSession.range(SIMHASH_BITS).select(F.col("id").cast("int").alias("b"))
    )
    # F.shiftright/F.shiftleft require a Python-int bit count; the SQL form
    # accepts a column, so variable shifts go through F.expr.
    bits = (
        hashed.crossJoin(F.broadcast(bits_range))
        .groupBy("doc_id", "b")
        .agg(
            F.when(
                F.sum(
                    F.when(F.expr("shiftright(hv, b)").bitwiseAND(1) == 1, 1).otherwise(-1)
                )
                >= 0,
                1,
            )
            .otherwise(0)
            .alias("bit")
        )
    )
    sigs = bits.groupBy("doc_id").agg(
        F.sum(F.expr("shiftleft(bit, b)")).cast("bigint").alias("simhash")
    )
    n_bands = SIMHASH_BITS // SIMHASH_BAND_BITS
    band_range = sigs.sparkSession.range(n_bands).select(F.col("id").cast("int").alias("band"))
    bands = sigs.crossJoin(F.broadcast(band_range)).select(
        "doc_id",
        "simhash",
        "band",
        F.expr(f"shiftright(simhash, band * {SIMHASH_BAND_BITS})")
        .bitwiseAND(2**SIMHASH_BAND_BITS - 1)
        .alias("band_val"),
    )
    a = bands.alias("a")
    b = bands.alias("b")
    hamming = F.bit_count(F.col("a.simhash").bitwiseXOR(F.col("b.simhash")))
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_val") == F.col("b.band_val"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .filter(hamming <= HAMMING_MAX)
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            hamming.cast("int").alias("hamming"),
        )
        .distinct()
    )
