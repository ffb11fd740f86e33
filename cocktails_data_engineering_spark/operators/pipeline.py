"""Composed pipelines — the end-to-end shapes users actually run, built
from the operator layers below and oracle-checked as single queries.

- :func:`training_corpus_pipeline` is the flagship LLM-data use case this
  engine exists for: quality-gate the corpus, then remove near-duplicate
  cluster members, and ship the kept set.  It composes the C4-style
  quality filter (operators/text_analysis), MinHash-LSH candidate
  generation + connected-components finalization (operators/dedup) in one
  plan.
- :func:`merge_upsert_orders` is the CDC/merge pattern — the grown-up
  version of the reference's append-only SQL staging
  (``scripts/spiders/web_spider_oo.py:343-350``): apply a change set
  (updates + inserts) to a snapshot via full-outer-join + coalesce, the
  engine-agnostic MERGE INTO.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.numerics import int_div
from ..registry import register
from ..sources.tables import load
from .dedup import _ORACLE_CANDIDATES, connected_components, minhash_candidates

# Quality gate (must stay in lockstep with text_analysis.quality_score):
# ≥ 20 tokens and a sane stopword ratio.
_STOPS = ("the", "a", "of", "and", "to", "in", "is")


@register(
    "training_corpus_pipeline",
    oracle=f"""
WITH RECURSIVE {_ORACLE_CANDIDATES},
edges AS (SELECT doc_a AS u, doc_b AS v FROM cands
          UNION SELECT doc_b, doc_a FROM cands),
reach(node, r) AS (
  SELECT u, u FROM (SELECT DISTINCT u FROM edges) t
  UNION
  SELECT reach.node, e.v FROM reach JOIN edges e ON e.u = reach.r
),
drop_set AS (SELECT node FROM reach GROUP BY node HAVING node <> MIN(r)),
quality AS (
  SELECT doc_id, lang, source,
         len(list_filter(string_split(text, ' '), w -> w <> '')) AS n_tokens,
         len(list_filter(string_split(text, ' '),
             w -> w IN ('the','a','of','and','to','in','is'))) AS n_stopwords
  FROM documents
)
SELECT doc_id, lang, source, n_tokens
FROM quality
WHERE n_tokens >= 20
  AND CAST(n_stopwords AS DOUBLE) / n_tokens BETWEEN 0.01 AND 0.5
  AND doc_id NOT IN (SELECT node FROM drop_set)
""",
)
def training_corpus_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The composed training-data pipeline: quality gate → near-dup
    removal → kept corpus.

    Scale shape: the quality gate is pure codegen'd expressions applied at
    the scan; the drop set (non-canonical near-dup cluster members) comes
    from the banded-LSH + connected-components pipeline and is tiny
    relative to the corpus, so the final removal is a broadcast-able
    left-anti join.  One pass over the documents plus the dedup machinery
    — no operator in the chain is all-pairs or single-partition.
    """
    docs = load(spark, sf_dir, "documents")

    toks = F.filter(F.split("text", " "), lambda w: w != "")
    stops = _STOPS

    def _stop_pred(ws):
        return lambda w: w.isin(*ws)

    quality = docs.select(
        "doc_id",
        "lang",
        "source",
        F.size(toks).alias("n_tokens"),
        F.size(F.filter(F.split("text", " "), _stop_pred(stops))).alias("n_stopwords"),
    )
    ratio = F.col("n_stopwords").cast("double") / F.col("n_tokens")
    gated = quality.filter((F.col("n_tokens") >= 20) & ratio.between(0.01, 0.5))

    clusters = connected_components(minhash_candidates(spark, sf_dir))
    drop = clusters.filter(F.col("node") != F.col("cluster_id")).select(
        F.col("node").alias("doc_id")
    )
    return gated.join(drop, "doc_id", "left_anti").select(
        "doc_id", "lang", "source", "n_tokens"
    )


@register(
    "merge_upsert_orders",
    oracle="""
WITH changes AS (
  -- updates: 10% of existing orders get a repriced total
  SELECT o_orderkey, o_totalprice * 1.1 AS o_totalprice, o_orderstatus
  FROM orders WHERE o_orderkey % 10 = 0
  UNION ALL
  -- inserts: brand-new keys above the current max
  SELECT o_orderkey + 10000000, 100.0 AS o_totalprice, 'N' AS o_orderstatus
  FROM orders WHERE o_orderkey % 1000 = 1
)
SELECT COALESCE(c.o_orderkey, b.o_orderkey) AS o_orderkey,
       COALESCE(c.o_totalprice, b.o_totalprice) AS o_totalprice,
       COALESCE(c.o_orderstatus, b.o_orderstatus) AS o_orderstatus
FROM (SELECT o_orderkey, o_totalprice, o_orderstatus FROM orders) b
FULL OUTER JOIN changes c USING (o_orderkey)
""",
)
def merge_upsert_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE INTO expressed engine-agnostically: snapshot ⟗ change-set,
    change wins (update), unmatched change inserts, unmatched base rows
    carry forward.

    Scale: one full-outer shuffle join on the key — the same cost as any
    keyed rewrite of the snapshot; table formats with merge-on-read defer
    this cost, but the logical semantics are exactly this plan.
    """
    base = load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice", "o_orderstatus"
    )
    updates = base.filter(F.col("o_orderkey") % 10 == 0).select(
        "o_orderkey",
        (F.col("o_totalprice") * 1.1).alias("o_totalprice"),
        "o_orderstatus",
    )
    inserts = base.filter(F.col("o_orderkey") % 1000 == 1).select(
        (F.col("o_orderkey") + 10_000_000).alias("o_orderkey"),
        F.lit(100.0).alias("o_totalprice"),
        F.lit("N").alias("o_orderstatus"),
    )
    changes = updates.unionByName(inserts)
    b = base.alias("b")
    c = changes.alias("c")
    return (
        b.join(c, F.col("b.o_orderkey") == F.col("c.o_orderkey"), "full_outer")
        .select(
            F.coalesce(F.col("c.o_orderkey"), F.col("b.o_orderkey")).alias("o_orderkey"),
            F.coalesce(F.col("c.o_totalprice"), F.col("b.o_totalprice")).alias(
                "o_totalprice"
            ),
            F.coalesce(F.col("c.o_orderstatus"), F.col("b.o_orderstatus")).alias(
                "o_orderstatus"
            ),
        )
    )


# ---------------------------------------------------------------------------
# Multimodal shard builder (third composed flagship)
# ---------------------------------------------------------------------------
SHARD_CAP_BYTES = 16_000

_SQL_MODALITY_P = (
    "CASE doc_id % 4 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' "
    "WHEN 2 THEN 'video' ELSE 'text' END"
)


@register(
    "multimodal_shard_pipeline",
    oracle=f"""
WITH media AS (
  SELECT doc_id, {_SQL_MODALITY_P} AS modality,
         octet_length(encode(text)) AS n_bytes,
         len(list_filter(string_split(text, ' '), w -> w <> '')) AS n_tokens
  FROM documents
),
eligible AS (
  SELECT doc_id, modality, n_bytes FROM media
  WHERE modality <> 'text' OR n_tokens >= 20
),
placed AS (
  SELECT doc_id, modality, n_bytes,
         CAST(COALESCE(SUM(n_bytes) OVER (
               PARTITION BY modality ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
              // {SHARD_CAP_BYTES} AS INT) AS shard_id
  FROM eligible
)
SELECT modality, shard_id,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_bytes) AS BIGINT) AS total_bytes,
       MIN(doc_id) AS first_doc,
       MAX(doc_id) AS last_doc
FROM placed
GROUP BY modality, shard_id
""",
)
def multimodal_shard_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The multimodal composed flagship: modality typing → per-modality
    quality gate (text documents below 20 tokens dropped; binary
    modalities pass on metadata) → deterministic byte-budget shard
    assignment → per-shard manifest.  This is the writer-side shape of a
    multimodal training pipeline: shards are what the training job's
    data loader streams, and the manifest is what gets committed.

    Shard placement is a running byte-sum window PARTITIONED BY MODALITY
    (mirrors pack_sequences_bins): per-modality parallelism, no global
    order, assignment purely a function of (modality, doc_id) order so
    any cluster produces identical shards.  The rollup is metadata-sized
    (shards, not documents).
    """
    docs = load(spark, sf_dir, "documents")
    modality = (
        F.when(F.col("doc_id") % 4 == 0, "image")
        .when(F.col("doc_id") % 4 == 1, "audio")
        .when(F.col("doc_id") % 4 == 2, "video")
        .otherwise("text")
    )
    media = docs.select(
        "doc_id",
        modality.alias("modality"),
        F.octet_length(F.encode(F.col("text"), "utf-8")).alias("n_bytes"),
        F.size(F.filter(F.split("text", " "), lambda w: w != "")).alias("n_tokens"),
    )
    eligible = media.filter(
        (F.col("modality") != "text") | (F.col("n_tokens") >= 20)
    ).select("doc_id", "modality", "n_bytes")
    from pyspark.sql import Window

    w = (
        Window.partitionBy("modality")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    placed = eligible.select(
        "doc_id",
        "modality",
        "n_bytes",
        int_div(
            F.coalesce(F.sum("n_bytes").over(w), F.lit(0)), SHARD_CAP_BYTES
        )
        .cast("int")
        .alias("shard_id"),
    )
    return placed.groupBy("modality", "shard_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("n_bytes").cast("bigint").alias("total_bytes"),
        F.min("doc_id").alias("first_doc"),
        F.max("doc_id").alias("last_doc"),
    )


# ---------------------------------------------------------------------------
# CDC log replay (reconstruct a table from base snapshot + ordered batches)
# ---------------------------------------------------------------------------

def apply_cdc(state: DataFrame, upserts: DataFrame, delete_keys: DataFrame) -> DataFrame:
    """One CDC batch: MERGE the upserts (change wins), then anti-join the
    tombstones — the log-structured replay step."""
    s = state.alias("s")
    c = upserts.alias("c")
    merged = s.join(c, F.col("s.o_orderkey") == F.col("c.o_orderkey"), "full_outer").select(
        F.coalesce(F.col("c.o_orderkey"), F.col("s.o_orderkey")).alias("o_orderkey"),
        F.coalesce(F.col("c.o_totalprice"), F.col("s.o_totalprice")).alias("o_totalprice"),
        F.coalesce(F.col("c.o_orderstatus"), F.col("s.o_orderstatus")).alias(
            "o_orderstatus"
        ),
    )
    return merged.join(delete_keys, "o_orderkey", "left_anti")


@register(
    "cdc_replay_reconstruct",
    oracle="""
WITH base AS (SELECT o_orderkey, o_totalprice, o_orderstatus FROM orders),
u1 AS (SELECT o_orderkey, o_totalprice * 1.1 AS o_totalprice, o_orderstatus
       FROM base WHERE o_orderkey % 10 = 0
       UNION ALL
       SELECT o_orderkey + 10000000, 100.0, 'N' FROM base WHERE o_orderkey % 1000 = 1),
d1 AS (SELECT o_orderkey FROM base WHERE o_orderkey % 1000 = 7),
s1 AS (
  SELECT COALESCE(c.o_orderkey, b.o_orderkey) AS o_orderkey,
         COALESCE(c.o_totalprice, b.o_totalprice) AS o_totalprice,
         COALESCE(c.o_orderstatus, b.o_orderstatus) AS o_orderstatus
  FROM base b FULL OUTER JOIN u1 c USING (o_orderkey)
),
s1d AS (SELECT * FROM s1 WHERE o_orderkey NOT IN (SELECT o_orderkey FROM d1)),
u2 AS (SELECT o_orderkey, o_totalprice + 5.0 AS o_totalprice, o_orderstatus
       FROM base WHERE o_orderkey % 15 = 0),
d2 AS (SELECT o_orderkey FROM base WHERE o_orderkey % 1000 = 13),
s2 AS (
  SELECT COALESCE(c.o_orderkey, b.o_orderkey) AS o_orderkey,
         COALESCE(c.o_totalprice, b.o_totalprice) AS o_totalprice,
         COALESCE(c.o_orderstatus, b.o_orderstatus) AS o_orderstatus
  FROM s1d b FULL OUTER JOIN u2 c USING (o_orderkey)
)
SELECT * FROM s2 WHERE o_orderkey NOT IN (SELECT o_orderkey FROM d2)
""",
)
def cdc_replay_reconstruct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reconstruct current state from a base snapshot plus TWO ordered CDC
    batches (upserts + tombstones each) — the log-structured time-travel
    read every merge-on-read table format performs.  Batch 2's changes
    apply on top of batch 1's result, so replay order matters and is
    oracle-verified end to end.

    Note batch-2 upserts are derived from the BASE key set: a key deleted
    by batch 1 can legitimately REAPPEAR if batch 2 upserts it (CDC
    re-insert semantics) — both engines replay the identical rule.

    Scale: each batch is one keyed full-outer shuffle + one anti join —
    cost proportional to |state| + |batch| per replayed batch; compaction
    (materializing s_k) is exactly the `materialize` seam between folds."""
    base = load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice", "o_orderstatus"
    )
    u1 = base.filter(F.col("o_orderkey") % 10 == 0).select(
        "o_orderkey",
        (F.col("o_totalprice") * 1.1).alias("o_totalprice"),
        "o_orderstatus",
    ).unionByName(
        base.filter(F.col("o_orderkey") % 1000 == 1).select(
            (F.col("o_orderkey") + 10_000_000).alias("o_orderkey"),
            F.lit(100.0).alias("o_totalprice"),
            F.lit("N").alias("o_orderstatus"),
        )
    )
    d1 = base.filter(F.col("o_orderkey") % 1000 == 7).select("o_orderkey")
    u2 = base.filter(F.col("o_orderkey") % 15 == 0).select(
        "o_orderkey",
        (F.col("o_totalprice") + 5.0).alias("o_totalprice"),
        "o_orderstatus",
    )
    d2 = base.filter(F.col("o_orderkey") % 1000 == 13).select("o_orderkey")

    s1 = apply_cdc(base, u1, d1)
    return apply_cdc(s1, u2, d2)


# Local copies of the downstream stages' constants: pipeline registers
# 6th, before curation/profiling/multimodal — importing them at decoration
# time would run their registrations out of order (profiling's spearman
# oracle resolves text_analysis specs at import).  Lockstep is enforced by
# tests/test_round9_ops.py::test_release_pipeline_constants_lockstep; the
# Spark function body imports the REAL constants at call time.
_REL_CONTAM_N = 5
_REL_BENCH_SQL = "substr(md5('bench|' || CAST(doc_id AS VARCHAR)), 1, 1) = '0'"
_REL_SHORT_TOKENS = 32
_REL_SHARD_CAP = 65536


def _release_oracle() -> str:
    CONTAM_N = _REL_CONTAM_N
    _BENCH_SQL = _REL_BENCH_SQL
    CARD_SHORT_TOKENS = _REL_SHORT_TOKENS
    SHARD_CAP_BYTES = _REL_SHARD_CAP

    return f"""
WITH RECURSIVE {_ORACLE_CANDIDATES},
edges AS (SELECT doc_a AS u, doc_b AS v FROM cands
          UNION SELECT doc_b, doc_a FROM cands),
reach(node, r) AS (
  SELECT u, u FROM (SELECT DISTINCT u FROM edges) t
  UNION
  SELECT reach.node, e.v FROM reach JOIN edges e ON e.u = reach.r
),
drop_set AS (SELECT node FROM reach GROUP BY node HAVING node <> MIN(r)),
toked AS (
  SELECT doc_id, list_filter(string_split(text, ' '), w -> w <> '') AS t
  FROM documents
),
grams AS (
  SELECT doc_id, array_to_string(t[i:i+{CONTAM_N - 1}], ' ') AS gram
  FROM (SELECT doc_id, t, unnest(range(1, len(t) - {CONTAM_N - 2})) AS i
        FROM toked WHERE len(t) >= {CONTAM_N})
),
bench AS (SELECT DISTINCT gram FROM grams
          WHERE {_BENCH_SQL.replace("doc_id", "grams.doc_id")}),
quarantine AS (
  SELECT DISTINCT g.doc_id FROM grams g JOIN bench b ON b.gram = g.gram
  WHERE NOT ({_BENCH_SQL.replace("doc_id", "g.doc_id")})
),
survivors AS (
  SELECT d.doc_id, octet_length(encode(d.text)) AS n_bytes
  FROM documents d JOIN toked tk ON tk.doc_id = d.doc_id
  WHERE len(tk.t) >= {CARD_SHORT_TOKENS}
    AND NOT ({_BENCH_SQL.replace("doc_id", "d.doc_id")})
    AND d.doc_id NOT IN (SELECT node FROM drop_set)
    AND d.doc_id NOT IN (SELECT doc_id FROM quarantine)
),
pos AS (
  SELECT doc_id, n_bytes,
         SUM(n_bytes) OVER (ORDER BY doc_id
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           - n_bytes AS cum_before
  FROM survivors
)
SELECT CAST(cum_before // {SHARD_CAP_BYTES} AS BIGINT) AS shard_id,
       CAST(COUNT(*) AS BIGINT) AS n_objects,
       CAST(SUM(n_bytes) AS BIGINT) AS total_bytes,
       CAST(MIN(doc_id) AS BIGINT) AS min_doc_id,
       CAST(MAX(doc_id) AS BIGINT) AS max_doc_id
FROM pos GROUP BY 1 ORDER BY shard_id
"""


@register("dataset_release_pipeline", oracle=_release_oracle())
def dataset_release_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship #8 — the EXPORT half of the corpus lifecycle, one plan:

    1. drop near-duplicate cluster members (MinHash-LSH candidates from
       the session cache → connected components → non-canonical drops),
    2. quarantine benchmark contamination (any shared 5-gram with the
       held-out benchmark slice; the benchmark docs themselves are
       excluded from the release — they are eval data),
    3. gate out short docs (< CARD_SHORT_TOKENS tokens),
    4. emit the WebDataset-style shard manifest of the surviving corpus
       (byte-cumsum absolute-offset shards).

    Every stage is the REGISTERED operator's logic (training_corpus_
    pipeline's dedup composition, contamination_ngram_audit's gram join,
    dataset_card_summary's short-doc rule, webdataset_shard_manifest's
    sharding) — the pipeline can't drift from the parts, and the oracle
    recomputes the whole lifecycle in one recursive CTE.

    Plan at 100 TB: candidate CC over capped LSH pairs, one gram-keyed
    join against the distinct benchmark gram set, map-side token/byte
    projections, one two-phase cumsum over survivors — no stage is
    quadratic and nothing materializes per-gram state."""
    from .curation import CONTAM_N
    from .evaluation import ordered_running_sums
    from .multimodal import SHARD_CAP_BYTES
    from .profiling import CARD_SHORT_TOKENS

    docs = load(spark, sf_dir, "documents")
    is_bench = (
        F.substring(
            F.md5(F.concat(F.lit("bench|"), F.col("doc_id").cast("string"))), 1, 1
        )
        == "0"
    )
    toked = docs.select(
        "doc_id",
        F.filter(F.split("text", " "), lambda w: w != "").alias("t"),
        F.octet_length(F.encode("text", "utf-8")).alias("n_bytes"),
    )
    grams = toked.filter(F.size("t") >= CONTAM_N).select(
        "doc_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.size("t") - (CONTAM_N - 1)),
                lambda i: F.concat_ws(" ", F.slice("t", i, CONTAM_N)),
            )
        ).alias("gram"),
    )
    bench = grams.filter(is_bench).select("gram").distinct()
    quarantine = (
        grams.filter(~is_bench)
        .join(F.broadcast(bench), "gram", "left_semi")
        .select("doc_id")
        .distinct()
    )
    drop_set = (
        connected_components(minhash_candidates(spark, sf_dir))
        .filter(F.col("node") != F.col("cluster_id"))
        .select(F.col("node").alias("doc_id"))
    )
    survivors = (
        toked.filter(F.size("t") >= CARD_SHORT_TOKENS)
        .filter(~is_bench)
        .join(drop_set, "doc_id", "left_anti")
        .join(quarantine, "doc_id", "left_anti")
        .select("doc_id", "n_bytes")
    )
    pos = ordered_running_sums(survivors, "doc_id", ["n_bytes"])
    shard = int_div(F.col("cum_n_bytes") - F.col("n_bytes"), SHARD_CAP_BYTES)
    return (
        pos.select(shard.alias("shard_id"), "doc_id", "n_bytes")
        .groupBy("shard_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_objects"),
            F.sum("n_bytes").cast("bigint").alias("total_bytes"),
            F.min("doc_id").cast("bigint").alias("min_doc_id"),
            F.max("doc_id").cast("bigint").alias("max_doc_id"),
        )
        .orderBy("shard_id")
    )
