"""Semantic invariants for the round-9 operators — properties the value
oracle can't state (coverage, conservation, monotonicity, planted
contamination, cache invalidation)."""

from __future__ import annotations

import hashlib
import os
import shutil

from pyspark.sql import functions as F

from cocktails_data_engineering_spark.operators.curation import (
    CONTAM_N,
    contamination_ngram_audit,
)
from cocktails_data_engineering_spark.operators.text_analysis import (
    CTX_CHUNK,
    CTX_STRIDE,
    PACK_C,
    context_window_chunks,
    packing_boundary_stats,
    vocab_coverage_curve,
)
from cocktails_data_engineering_spark.sources.tables import load


def test_context_windows_cover_every_token_exactly(spark, sf_dir):
    """Window set per doc must tile [0, n_tok): starts at stride multiples,
    all full-size except possibly the last, and the last must reach
    n_tok — no token dropped, no phantom window past the end."""
    chunks = {
        (r.doc_id, r.chunk_idx): (r.start_tok, r.n_toks)
        for r in context_window_chunks(spark, sf_dir).collect()
    }
    n_tok = {
        r.doc_id: r.n
        for r in load(spark, sf_dir, "documents")
        .select(
            "doc_id",
            F.size(F.filter(F.split("text", " "), lambda w: w != "")).alias("n"),
        )
        .collect()
    }
    per_doc: dict[int, list] = {}
    for (doc, idx), (start, n) in chunks.items():
        per_doc.setdefault(doc, []).append((idx, start, n))
    assert set(per_doc) == {d for d, n in n_tok.items() if n >= 1}
    for doc, rows in per_doc.items():
        rows.sort()
        for i, (idx, start, n) in enumerate(rows):
            assert idx == i
            assert start == i * CTX_STRIDE
            assert 1 <= n <= CTX_CHUNK
            if i < len(rows) - 1:
                assert n == CTX_CHUNK  # only the last window may be short
        last_idx, last_start, last_n = rows[-1]
        assert last_start + last_n == n_tok[doc]  # tail covered exactly
        if len(rows) > 1:
            # one fewer window would leave a gap at the end
            prev_start = (len(rows) - 2) * CTX_STRIDE
            assert prev_start + CTX_CHUNK < n_tok[doc]


def test_packing_histogram_conserves_docs_and_chunks(spark, sf_dir):
    rows = packing_boundary_stats(spark, sf_dir).collect()
    docs = (
        load(spark, sf_dir, "documents")
        .select(F.size(F.filter(F.split("text", " "), lambda w: w != "")).alias("n"))
        .filter(F.col("n") >= 1)
    )
    n_docs = docs.count()
    total_tokens = docs.agg(F.sum("n")).first()[0]
    total_chunks = (total_tokens + PACK_C - 1) // PACK_C
    assert sum(r.docs_ending_in_chunk * r.n_chunks for r in rows) == n_docs
    assert sum(r.n_chunks for r in rows) == total_chunks


def test_vocab_coverage_monotone_and_saturating(spark, sf_dir):
    rows = sorted(vocab_coverage_curve(spark, sf_dir).collect(), key=lambda r: r.k)
    assert [r.k for r in rows] == [1, 2, 4, 8, 16, 32]
    covs = [r.coverage for r in rows]
    assert all(0 < c <= 1.0 for c in covs)
    assert covs == sorted(covs)  # nondecreasing in k
    # the fixture vocabulary is ~31 words, so k=32 covers everything
    assert covs[-1] == 1.0
    assert rows[-1].covered_tokens == rows[-1].total_tokens


def test_contamination_planted_copy_scores_one(spark, tmp_path):
    """Plant a training doc that is a verbatim copy of a benchmark doc:
    every one of its n-grams is contaminated, so it must surface with
    rate exactly 1.0; an unrelated doc must score 0."""

    def is_bench(doc_id: int) -> bool:
        return hashlib.md5(f"bench|{doc_id}".encode()).hexdigest()[0] == "0"

    bench_id = next(i for i in range(1000) if is_bench(i))
    train_ids = [i for i in range(1000) if not is_bench(i)][:2]
    bench_text = "alpha beta gamma delta epsilon zeta eta theta"
    clean_text = "one two three four five six seven eight nine"
    rows = [
        (bench_id, bench_text, "en", "w"),
        (train_ids[0], bench_text, "en", "w"),  # the planted copy
        (train_ids[1], clean_text, "en", "w"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string, source string")
    df.coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    out = {r.doc_id: r for r in contamination_ngram_audit(spark, str(tmp_path)).collect()}
    assert bench_id not in out  # benchmark docs are never scored
    assert out[train_ids[0]].contamination_rate == 1.0
    assert out[train_ids[1]].contamination_rate == 0.0
    n_words = len(bench_text.split())
    assert out[train_ids[0]].n_grams == n_words - CONTAM_N + 1


def test_minhash_candidates_cache_invalidates_on_rewrite(spark, sf_dir, tmp_path):
    from cocktails_data_engineering_spark.operators import dedup

    sf = str(tmp_path)
    src = f"{sf_dir}/documents.parquet"
    dst = f"{sf}/documents.parquet"
    (shutil.copytree if os.path.isdir(src) else shutil.copy)(src, dst)
    a = dedup.minhash_candidates(spark, sf)
    b = dedup.minhash_candidates(spark, sf)
    assert a is b  # same session + same bytes => cached object
    # rewrite the fixture at the same path: the fingerprint must change
    load(spark, sf, "documents").limit(10).write.mode("overwrite").parquet(
        f"{sf}/documents.parquet.tmp"
    )
    (shutil.rmtree if os.path.isdir(dst) else os.remove)(dst)
    shutil.move(f"{sf}/documents.parquet.tmp", dst)
    c = dedup.minhash_candidates(spark, sf)
    assert c is not a


def test_pii_planted_documents_are_detected(spark, tmp_path):
    """The fixture has no PII (zero counts is correct); plant documents
    carrying each pattern and assert exact per-kind counts."""
    from cocktails_data_engineering_spark.operators.curation import (
        pii_redaction_stats,
    )

    rows = [
        (1, "contact me at alice@example.com or bob@test.org today", "en", "w"),
        (2, "server at 192.168.1.10 and 10.0.0.1 plus call 555-123-4567", "en", "w"),
        (3, "nothing sensitive here at all", "en", "w"),
        (4, "téléphone 555 987 6543", "fr", "w"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string, source string")
    df.coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    out = {r.lang: r for r in pii_redaction_stats(spark, str(tmp_path)).collect()}
    en, fr = out["en"], out["fr"]
    assert en.total_email == 2
    assert en.total_ipv4 == 2
    assert en.total_phone == 1
    assert en.docs_with_pii == 2  # docs 1 and 2; doc 3 clean
    assert fr.total_phone == 1 and fr.docs_with_pii == 1


def test_intra_doc_repetition_flags_planted_loop(spark, tmp_path):
    """A doc that is one phrase looped must score near 1; fully distinct
    text must not appear above it."""
    from cocktails_data_engineering_spark.operators.text_analysis import (
        intra_doc_repetition,
    )

    loop = " ".join(["spam ham eggs"] * 20)  # 60 tokens, 3-grams cycle over 3 values
    distinct = " ".join(f"w{i}" for i in range(60))
    rows = [(1, loop, "en", "w"), (2, distinct, "en", "w")]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string, source string")
    df.coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    out = {r.doc_id: r for r in intra_doc_repetition(spark, str(tmp_path)).collect()}
    assert out[1].repeated_frac > 0.9
    assert out[1].max_gram_count == 20  # 'spam ham eggs' appears once per cycle
    assert out[2].repeated_frac == 0.0
    assert out[2].n_grams == out[2].n_distinct


def test_matryoshka_recall_well_formed(spark, sf_dir):
    from cocktails_data_engineering_spark.operators.similarity import (
        QUERY_MOD,
        TOP_K,
        matryoshka_prefix_recall,
    )

    rows = matryoshka_prefix_recall(spark, sf_dir).collect()
    n_queries = (
        load(spark, sf_dir, "embeddings")
        .filter(F.col("vec_id") % QUERY_MOD == 0)
        .count()
    )
    assert len(rows) == n_queries  # every query reports, even at 0 recall
    for r in rows:
        assert 0 <= r.n_overlap <= TOP_K
        assert abs(r.recall_at_k - r.n_overlap / TOP_K) < 1e-9


def test_webdataset_manifest_conserves_objects_and_bytes(spark, sf_dir):
    from cocktails_data_engineering_spark.operators.multimodal import (
        media_table,
        webdataset_shard_manifest,
    )

    rows = webdataset_shard_manifest(spark, sf_dir).collect()
    media = media_table(spark, sf_dir)
    n_docs = media.count()
    total_bytes = media.agg(F.sum("n_bytes")).first()[0]
    assert sum(r.n_objects for r in rows) == n_docs
    assert sum(r.total_bytes for r in rows) == total_bytes
    for r in rows:
        assert r.n_image + r.n_audio + r.n_video + r.n_text == r.n_objects
    # shard ids must be contiguous from 0 (no empty holes: every byte
    # offset range below the max shard is occupied by construction)
    ids = sorted(r.shard_id for r in rows)
    assert ids == list(range(len(ids)))


def test_dataset_card_cross_checks(spark, sf_dir):
    from cocktails_data_engineering_spark.operators.profiling import (
        dataset_card_summary,
    )

    card = dataset_card_summary(spark, sf_dir).collect()[0]
    docs = load(spark, sf_dir, "documents")
    assert card.n_docs == docs.count()
    assert card.n_langs == docs.select("lang").distinct().count()
    distinct_texts = docs.select(F.md5("text")).distinct().count()
    assert card.exact_dup_docs == card.n_docs - distinct_texts
    assert 0 <= card.exact_dup_rate <= 1


def test_stream_datasource_replay_contract():
    """readBetweenOffsets must regenerate exactly what read() emitted for
    any committed offset range — the exactly-once recovery contract."""
    from cocktails_data_engineering_spark.sources.python_source import (
        STREAM_CHUNK,
        STREAM_ROWS,
        _SynthStreamReader,
    )

    r = _SynthStreamReader()
    off = r.initialOffset()
    seen = []
    for _ in range(STREAM_ROWS // STREAM_CHUNK + 2):
        rows, nxt = r.read(off)
        rows = list(rows)
        assert list(r.readBetweenOffsets(off, nxt)) == rows
        seen.extend(rows)
        if nxt == off:  # drained: no progress, no rows
            assert rows == []
            break
        off = nxt
    assert len(seen) == STREAM_ROWS
    assert [x[0] for x in seen] == list(range(STREAM_ROWS))


def test_release_pipeline_constants_lockstep():
    """pipeline.py carries local copies of downstream-stage constants
    (import-order: pipeline registers before curation/profiling/
    multimodal); they must never drift from the owning modules."""
    from cocktails_data_engineering_spark.operators import pipeline
    from cocktails_data_engineering_spark.operators.curation import (
        _BENCH_SQL,
        CONTAM_N,
    )
    from cocktails_data_engineering_spark.operators.multimodal import (
        SHARD_CAP_BYTES,
    )
    from cocktails_data_engineering_spark.operators.profiling import (
        CARD_SHORT_TOKENS,
    )

    assert pipeline._REL_CONTAM_N == CONTAM_N
    assert pipeline._REL_BENCH_SQL == _BENCH_SQL
    assert pipeline._REL_SHORT_TOKENS == CARD_SHORT_TOKENS
    assert pipeline._REL_SHARD_CAP == SHARD_CAP_BYTES
