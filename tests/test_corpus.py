"""Structural properties of the corpus-preparation operators (the oracle
parity test already checks exact values; these pin the semantic contracts
that matter even if constants change)."""

from __future__ import annotations

from pyspark.sql import functions as F

from cocktails_data_engineering_spark.operators import corpus


def test_chunks_cover_every_token(spark, sf_dir):
    """Union of chunk windows covers [0, n_tokens) for every document, and
    consecutive chunks overlap by exactly size-stride (except the tail)."""
    chunks = corpus.chunk_documents_stride(spark, sf_dir)
    per_doc = (
        chunks.groupBy("doc_id")
        .agg(
            F.max(F.col("chunk_start") + F.col("n_chunk_tokens")).alias("covered"),
            F.count(F.lit(1)).alias("n_chunks"),
            F.max("chunk_start").alias("last_start"),
        )
        .collect()
    )
    docs = corpus.load(spark, sf_dir, "documents")
    n_tokens = {
        r["doc_id"]: r["n"]
        for r in docs.select(
            "doc_id", F.size(corpus._tokens()).alias("n")
        ).collect()
    }
    assert per_doc, "no chunks produced"
    for r in per_doc:
        n = n_tokens[r["doc_id"]]
        assert r["covered"] == n, f"doc {r['doc_id']}: covered {r['covered']} != {n}"
        # starts are 0, stride, 2*stride, ... <= n-1
        assert r["last_start"] == ((n - 1) // corpus.CHUNK_STRIDE) * corpus.CHUNK_STRIDE


def test_boilerplate_kept_subset_and_drops_something(spark, sf_dir):
    out = corpus.line_dedup_boilerplate(spark, sf_dir)
    rows = out.collect()
    assert rows
    dropped_total = sum(r["n_lines"] - r["n_kept_lines"] for r in rows)
    assert dropped_total > 0, "threshold never fires — boilerplate rule is vacuous"
    docs_text = {
        r["doc_id"]: r["text"]
        for r in corpus.load(spark, sf_dir, "documents").collect()
    }
    for r in rows[:50]:
        assert 0 <= r["n_kept_lines"] <= r["n_lines"]
        # kept text is a subsequence of the original token stream
        kept = r["kept_text"].split() if r["kept_text"] else []
        orig = docs_text[r["doc_id"]].split()
        it = iter(orig)
        assert all(tok in it for tok in kept), f"doc {r['doc_id']}: kept_text reordered"


def test_packing_bins_contiguous_and_bounded(spark, sf_dir):
    out = corpus.pack_sequences_bins(spark, sf_dir).collect()
    by_source: dict[str, list] = {}
    for r in out:
        by_source.setdefault(r["source"], []).append(r)
    assert by_source
    for source, bins in by_source.items():
        bins.sort(key=lambda r: r["bin_id"])
        assert [b["bin_id"] for b in bins] == list(range(len(bins))), source
        # bin_id = floor((cum-1)/cap) means the cumulative token count at
        # the END of bin i must land inside (i*cap, (i+1)*cap]
        cum = 0
        cap = corpus.PACK_CAPACITY
        for b in bins:
            cum += b["sum_tokens"]
            assert b["bin_id"] * cap < cum <= (b["bin_id"] + 1) * cap, (source, b)
        # doc ranges must not interleave across bins
        for a, b in zip(bins, bins[1:]):
            assert a["last_doc"] < b["first_doc"], source


def test_rare_ratio_bounds(spark, sf_dir):
    rows = corpus.rare_token_stats(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0 <= r["n_rare_tokens"] <= r["n_tokens"]
        assert 0.0 <= r["rare_ratio"] <= 1.0
        assert r["n_rare_distinct"] <= r["n_rare_tokens"]


def test_contamination_eval_only_and_bounds(spark, sf_dir):
    rows = corpus.eval_contamination_overlap(spark, sf_dir).collect()
    assert rows, "no eval documents matched — EVAL_MOD too large for fixture"
    for r in rows:
        assert r["doc_id"] % corpus.EVAL_MOD == 0
        assert 0 <= r["n_overlapping"] <= r["n_ngrams"]
        assert 0.0 <= r["overlap_ratio"] <= 1.0
        expected_flag = int(r["n_overlapping"] / r["n_ngrams"] >= corpus.CONTAM_FLAG_RATIO)
        assert r["is_contaminated"] == expected_flag


def test_repetition_bounds_and_consistency(spark, sf_dir):
    rows = corpus.doc_repetition_stats(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 1 <= r["n_distinct_lines"] <= r["n_lines"]
        assert r["top_line_repeats"] >= 1
        if r["n_distinct_lines"] == r["n_lines"]:
            assert r["dup_line_ratio"] == 0.0
            assert r["top_line_repeats"] == 1
        else:
            assert r["dup_line_ratio"] > 0.0
            assert r["top_line_repeats"] > 1


def test_pii_scrub_finds_planted_pii_and_shrinks_text(spark, sf_dir):
    rows = corpus.pii_scrub_stats(spark, sf_dir).collect()
    assert rows
    total_docs = sum(r["n_docs"] for r in rows)
    # every document got exactly one planted email and one planted phone
    assert sum(r["total_emails"] for r in rows) == total_docs
    assert sum(r["total_phones"] for r in rows) == total_docs
    for r in rows:
        # redaction placeholders are shorter than the planted spans
        assert r["chars_out"] < r["chars_in"]


def test_bm25_results_contain_query_terms(spark, sf_dir):
    from cocktails_data_engineering_spark.operators.lexical import (
        BM25_QUERY,
        BM25_TOP,
        bm25_keyword_search,
    )

    rows = bm25_keyword_search(spark, sf_dir).collect()
    assert 0 < len(rows) <= BM25_TOP
    scores = [r.bm25 for r in rows]
    assert scores == sorted(scores, reverse=True)
    texts = {
        r.doc_id: r.text
        for r in spark.read.parquet(f"{sf_dir}/documents.parquet").collect()
    }
    for r in rows:
        assert any(t in texts[r.doc_id].split(" ") for t in BM25_QUERY), r.doc_id


def test_bpe_train_merges_recounts_after_each_merge(spark, tmp_path):
    """The iterated trainer must re-count pairs on the MERGED corpus:
    hand-computed greedy BPE on a fixture with an overlapping run
    ('aaab' contains (a,a) twice, overlapping — greedy left-to-right
    takes the first only) and a tie round (count tie broken
    lexicographically)."""
    import os

    from cocktails_data_engineering_spark.operators.text_analysis import (
        bpe_train_merges,
    )

    docs = spark.createDataFrame(
        [(1, "aaab aaab abab", "en", "web", 14)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    docs.coalesce(1).write.mode("overwrite").parquet(
        os.path.join(str(tmp_path), "documents.parquet")
    )
    rows = [tuple(r) for r in bpe_train_merges(spark, str(tmp_path)).collect()]
    # r1: (a,a)=4 ties (a,b)=4 -> lexicographic (a,a); 'aaab' -> [aa,a,b]
    # r2: (a,b)=4 wins over (aa,a)=2, (b,a)=1; 'abab' -> [ab,ab]
    # r3: (aa,ab)=2 wins over (ab,ab)=1
    assert rows == [
        (1, "a", "a", "aa", 4),
        (2, "a", "b", "ab", 4),
        (3, "aa", "ab", "aaab", 2),
    ]


def test_ngram_diversity_flags_templated_source(spark, tmp_path):
    """Bounds hold (distinct <= total, ratios in (0,1]) and a templated
    source scores strictly lower bigram diversity than a varied one."""
    import os

    from cocktails_data_engineering_spark.operators.text_analysis import (
        ngram_diversity_by_source,
    )

    rows = [(i, "the same template line again", "en", "spun", 27) for i in range(20)]
    rows += [
        (100 + i, " ".join(f"w{i}x{j}" for j in range(10)), "en", "varied", 60)
        for i in range(20)
    ]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(1).write.mode("overwrite").parquet(
        os.path.join(str(tmp_path), "documents.parquet")
    )
    out = {r["source"]: r for r in ngram_diversity_by_source(spark, str(tmp_path)).collect()}
    for r in out.values():
        assert 0 < r["n_types"] <= r["n_tokens"]
        assert 0 < r["type_token_ratio"] <= 1
        assert 0 < r["bigram_diversity"] <= 1
    assert out["spun"]["bigram_diversity"] < out["varied"]["bigram_diversity"]
    assert out["spun"]["type_token_ratio"] < out["varied"]["type_token_ratio"]
