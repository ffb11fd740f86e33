"""Similarity-search semantics beyond the oracle diff: ANN recall vs the
exact brute-force baseline, and structural invariants of the top-k shape."""

from __future__ import annotations

from cocktails_data_engineering_spark.operators.similarity import (
    TOP_K,
    ann_cosine_lsh,
    cosine_topk,
)


def test_cosine_topk_shape(spark, sf_dir):
    rows = cosine_topk(spark, sf_dir).collect()
    per_query: dict[int, list] = {}
    for r in rows:
        per_query.setdefault(r.query_id, []).append(r)
        assert r.vec_id != r.query_id  # self-match excluded
        assert 1 <= r.rank <= TOP_K
    for qid, rs in per_query.items():
        assert len(rs) == TOP_K, qid
        ranks = sorted(r.rank for r in rs)
        assert ranks == list(range(1, TOP_K + 1)), qid
        by_rank = sorted(rs, key=lambda r: r.rank)
        scores = [r.score for r in by_rank]
        assert scores == sorted(scores, reverse=True), qid


def test_ann_recall_vs_exact(spark, sf_dir):
    """Sign-LSH is approximate; over near-random fixture vectors (weak
    neighbor structure, the hardest case for LSH) recall still must beat
    chance by a wide margin."""
    exact = {(r.query_id, r.vec_id) for r in cosine_topk(spark, sf_dir).collect()}
    ann = {(r.query_id, r.vec_id) for r in ann_cosine_lsh(spark, sf_dir).collect()}
    recall = len(exact & ann) / len(exact)
    # chance level: TOP_K / n_vectors ≈ 1% — require >25× chance
    assert recall >= 0.25, f"ANN recall {recall:.2f} below floor"


def test_ann_deterministic(spark, sf_dir):
    a = sorted(map(tuple, ann_cosine_lsh(spark, sf_dir).collect()))
    b = sorted(map(tuple, ann_cosine_lsh(spark, sf_dir).collect()))
    assert a == b
