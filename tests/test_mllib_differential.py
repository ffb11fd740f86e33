"""Differential test: the hand-rolled MinHash band scheme vs MLlib.

SURVEY §2.3 names MLlib's ``MinHashLSH`` as the canonical near-dedup
primitive; until now the custom 128-perm/32x4-band scheme was proven
only against planted clusters and the DuckDB oracle.  This test builds
GROUND TRUTH — exact shingle Jaccard over every co-shingled pair of the
sf0.001 corpus — and requires BOTH detectors to recall the
high-similarity pairs:

- hand-rolled ``minhash_candidates_from`` (dedup.py): banded LSH, OR of
  32 bands of 4 rows → P(candidate | J) = 1-(1-J^4)^32, ≈0.9998 at J=0.7;
- MLlib ``MinHashLSH`` over an exact CountVectorizer set encoding with 32
  hash tables → approxSimilarityJoin at Jaccard distance ≤ 0.3, the same
  J ≥ 0.7 operating point.

Both run on identical shingle sets, so a recall gap implicates the band
scheme itself, not tokenization.  The test also asserts the hand-rolled
candidate set is a sparse subset of the pair space (the entire point of
banding), not a quadratic blow-up.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cocktails_data_engineering_spark.operators.dedup import (
    _shingles,
    minhash_candidates_from,
)
from cocktails_data_engineering_spark.sources.tables import load

J_HIGH = 0.7  # operating point: both schemes must recall J >= 0.7 pairs
MIN_RECALL = 0.9


@pytest.fixture(scope="module")
def shingled(spark, sf_dir):
    return _shingles(load(spark, sf_dir, "documents")).cache()


@pytest.fixture(scope="module")
def truth_pairs(shingled):
    """Exact Jaccard for every pair sharing >= 1 shingle (ground truth)."""
    counts = shingled.groupBy("doc_id").agg(F.count("*").alias("n_sh"))
    a = shingled.select(F.col("doc_id").alias("doc_a"), "shingle")
    b = shingled.select(F.col("doc_id").alias("doc_b"), "shingle")
    common = (
        a.join(b, "shingle")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("n_common"))
    )
    j = (
        common.join(counts.withColumnsRenamed({"doc_id": "doc_a", "n_sh": "na"}), "doc_a")
        .join(counts.withColumnsRenamed({"doc_id": "doc_b", "n_sh": "nb"}), "doc_b")
        .select(
            "doc_a",
            "doc_b",
            (F.col("n_common") / (F.col("na") + F.col("nb") - F.col("n_common"))).alias(
                "jaccard"
            ),
        )
    )
    return {(r.doc_a, r.doc_b) for r in j.filter(F.col("jaccard") >= J_HIGH).collect()}


def _recall(found: set, truth: set) -> float:
    return len(found & truth) / len(truth) if truth else 1.0


def test_hand_rolled_bands_recall_high_jaccard_pairs(shingled, truth_pairs):
    assert truth_pairs, "fixture should contain planted near-duplicates"
    cands = {
        (r.doc_a, r.doc_b) for r in minhash_candidates_from(shingled).collect()
    }
    assert _recall(cands, truth_pairs) >= MIN_RECALL, (
        f"band scheme missed {len(truth_pairs - cands)} of "
        f"{len(truth_pairs)} J>={J_HIGH} pairs"
    )
    # Banding must PRUNE: candidates are a sparse subset of the pair space.
    n_docs = shingled.select("doc_id").distinct().count()
    assert len(cands) < 0.1 * n_docs * (n_docs - 1) / 2


def test_mllib_minhash_agrees_with_hand_rolled(spark, shingled, truth_pairs):
    """MLlib over the same shingle sets must land on the same operating
    point — and neither detector may lag the other by more than the
    probabilistic slack at J >= 0.7 (both detection curves are ~1 there)."""
    from pyspark.ml.feature import CountVectorizer, MinHashLSH

    sets = shingled.groupBy("doc_id").agg(
        F.collect_set("shingle").alias("shingles")
    )
    cv = CountVectorizer(
        inputCol="shingles", outputCol="features", binary=True, minDF=1.0
    ).fit(sets)
    feats = cv.transform(sets).select("doc_id", "features")
    lsh = MinHashLSH(
        inputCol="features", outputCol="hashes", numHashTables=32, seed=97
    ).fit(feats)
    joined = lsh.approxSimilarityJoin(feats, feats, 1.0 - J_HIGH, distCol="d")
    mllib_pairs = {
        (r["datasetA"]["doc_id"], r["datasetB"]["doc_id"])
        for r in joined.collect()
        if r["datasetA"]["doc_id"] < r["datasetB"]["doc_id"]
    }
    hand_pairs = {
        (r.doc_a, r.doc_b) for r in minhash_candidates_from(shingled).collect()
    }
    r_mllib = _recall(mllib_pairs, truth_pairs)
    r_hand = _recall(hand_pairs, truth_pairs)
    assert r_mllib >= MIN_RECALL, f"MLlib recall {r_mllib:.2f}"
    assert r_hand >= r_mllib - 0.05, (
        f"hand-rolled bands ({r_hand:.2f}) trail MLlib ({r_mllib:.2f}) "
        "beyond probabilistic slack"
    )


# ---------------------------------------------------------------------------
# Differential #2: exact cosine_topk vs MLlib BucketedRandomProjectionLSH
# ---------------------------------------------------------------------------
def test_brp_lsh_ann_recalls_exact_cosine_topk(spark, sf_dir):
    """The engine's exact cosine_topk is the stated ground-truth baseline
    for the ANN family.  MLlib's BucketedRandomProjectionLSH (Euclidean)
    over L2-NORMALIZED vectors searches the same geometry (on the unit
    sphere, ||a-b||^2 = 2 - 2*cos), so its approxSimilarityJoin at a
    generous radius must recall most exact top-k neighbor pairs.  A recall
    collapse implicates either our exact baseline or the normalization —
    either is a real bug.  (Recall bar is modest: BRP-LSH with few tables
    is a weaker structure than the banded MinHash scheme.)"""
    from pyspark.ml.feature import BucketedRandomProjectionLSH, Normalizer
    from pyspark.ml.functions import array_to_vector

    from cocktails_data_engineering_spark.plans import queries as plans

    exact = {
        (r.query_id, r.vec_id)
        for r in plans.all_queries()["cosine_topk"](spark, sf_dir).collect()
        if r.score >= 0.2  # BRP radius below only covers genuinely-near pairs
    }
    if not exact:
        pytest.skip("no sufficiently-similar exact pairs at this fixture")

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id",
        array_to_vector(
            F.expr("transform(embedding, x -> CAST(x AS DOUBLE))")
        ).alias("raw"),
    )
    unit = Normalizer(inputCol="raw", outputCol="v", p=2.0).transform(emb)
    model = BucketedRandomProjectionLSH(
        inputCol="v", outputCol="hashes", bucketLength=0.5, numHashTables=8, seed=7
    ).fit(unit)
    # cos >= 0.2 on the unit sphere -> ||a-b|| <= sqrt(2 - 2*0.2) ~= 1.265
    joined = model.approxSimilarityJoin(unit, unit, 1.266, distCol="d")
    found = {
        (r["datasetA"]["vec_id"], r["datasetB"]["vec_id"])
        for r in joined.collect()
        if r["datasetA"]["vec_id"] != r["datasetB"]["vec_id"]
    }
    hit = sum(1 for p in exact if p in found or (p[1], p[0]) in found)
    recall = hit / len(exact)
    assert recall >= 0.8, f"BRP-LSH recall {recall:.2f} over {len(exact)} exact pairs"
