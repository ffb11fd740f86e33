"""Curation-operator semantics beyond the oracle diff: planted
semantic duplicates, mixture-sampling invariants, percentile-cut math."""

from __future__ import annotations

from pyspark.sql import functions as F

from cocktails_data_engineering_spark.operators.curation import (
    MIX_WEIGHTS,
    domain_mixture_sample,
    quality_percentile_filter,
    semantic_dedup_clusters,
    within_cluster_dups,
)
from cocktails_data_engineering_spark.operators.similarity import _norm


def test_semantic_dedup_counts_consistent(spark, sf_dir):
    rows = semantic_dedup_clusters(spark, sf_dir).collect()
    assert rows, "no clusters"
    emb_total = spark.read.parquet(f"{sf_dir}/embeddings.parquet").count()
    assert sum(r.n_members for r in rows) == emb_total
    for r in rows:
        assert r.n_dups >= 0
        assert r.n_kept + r.n_dups == r.n_members


def test_within_cluster_dups_planted(spark):
    """A planted near-identical pair in the same cluster marks exactly the
    higher id as the duplicate; a cross-cluster identical pair is NOT a
    candidate (the SemDeDup pruning semantics)."""
    rows = [
        (0, 1, [1.0, 0.0, 0.0]),
        (0, 2, [1.0, 1e-7, 0.0]),  # near-identical to vec 1, same cluster
        (0, 3, [0.0, 1.0, 0.0]),  # orthogonal — kept
        (1, 4, [1.0, 0.0, 0.0]),  # identical to vec 1 but other cluster
    ]
    sides = spark.createDataFrame(
        rows, "cid int, vec_id int, emb array<double>"
    ).withColumn("nrm", _norm(F.col("emb")))
    dups = {(r.cid, r.ib) for r in within_cluster_dups(sides, 0.95).collect()}
    assert dups == {(0, 2)}


def test_mixture_sample_invariants(spark, sf_dir):
    rows = {r.lang: r for r in domain_mixture_sample(spark, sf_dir).collect()}
    assert set(rows) == set(MIX_WEIGHTS)
    for lang, r in rows.items():
        assert 0 <= r.n_kept <= r.n_docs, lang
        assert 0.0 < r.sample_rate <= 1.0, lang
        if r.sample_rate == 1.0:  # rate-saturated domain keeps everything
            assert r.n_kept == r.n_docs, lang
    # the binding domain (smallest n/w) is always rate-1.0
    assert any(r.sample_rate == 1.0 for r in rows.values())


def test_mixture_sample_deterministic(spark, sf_dir):
    a = sorted(map(tuple, domain_mixture_sample(spark, sf_dir).collect()))
    b = sorted(map(tuple, domain_mixture_sample(spark, sf_dir).collect()))
    assert a == b


def test_quality_percentile_cut_size(spark, sf_dir):
    """percent_rank ≤ 0.5 with a unique ordering keeps exactly
    floor((n-1)/2)+1 rows per source."""
    for r in quality_percentile_filter(spark, sf_dir).collect():
        assert r.n_kept == (r.n_docs - 1) // 2 + 1, r.source
        assert r.min_kept_score is not None
        assert r.avg_kept_score >= r.min_kept_score


def test_label_prototype_confusion_diagonal(spark, sf_dir):
    """Prototypes learned from the labels themselves must classify at
    least as well as chance by a wide margin: the diagonal (correct)
    mass dominates every off-diagonal cell total."""
    from cocktails_data_engineering_spark.operators.curation import (
        label_prototype_confusion,
    )

    rows = label_prototype_confusion(spark, sf_dir).collect()
    total = sum(r.n for r in rows)
    diag = sum(r.n for r in rows if r.true_label == r.pred_label)
    n_labels = len({r.true_label for r in rows})
    assert total == spark.read.parquet(f"{sf_dir}/embeddings.parquet").count()
    assert diag / total > 1.0 / n_labels  # beats chance


def test_hard_negatives_are_wrong_label(spark, sf_dir):
    from cocktails_data_engineering_spark.operators.curation import (
        N_HARD_NEG,
        hard_negative_mining,
    )

    vecs = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    labels = {r.vec_id: r.label for r in vecs.select("vec_id", "label").collect()}
    per_q: dict[int, list] = {}
    for r in hard_negative_mining(spark, sf_dir).collect():
        per_q.setdefault(r.query_id, []).append(r)
        assert labels[r.vec_id] != labels[r.query_id], "negative shares the anchor label"
    for qid, rs in per_q.items():
        assert len(rs) == N_HARD_NEG
        scores = [r.score for r in sorted(rs, key=lambda r: r.rank)]
        assert scores == sorted(scores, reverse=True)


def test_curation_pipeline_funnel_monotone(spark, sf_dir):
    """Each stage can only shrink a language's doc set, and the stage-1
    counts must equal domain_mixture_sample's n_kept exactly."""
    from cocktails_data_engineering_spark.operators.curation import curation_pipeline

    rows = {r.lang: r for r in curation_pipeline(spark, sf_dir).collect()}
    mix = {r.lang: r.n_kept for r in domain_mixture_sample(spark, sf_dir).collect()}
    assert rows
    for lang, r in rows.items():
        assert r.n_docs >= r.n_sampled >= r.n_quality >= r.n_final >= 0, lang
        assert r.n_sampled == mix.get(lang, 0), lang


def test_incremental_semantic_dedup_invariants(spark, sf_dir):
    from cocktails_data_engineering_spark.operators.curation import (
        BATCH_MOD,
        incremental_semantic_dedup,
    )

    rows = incremental_semantic_dedup(spark, sf_dir).collect()
    n_batch = (
        spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        .filter(f"vec_id % {BATCH_MOD} = 0")
        .count()
    )
    assert len(rows) == n_batch  # every batch vector is screened
    assert len({r.cluster_id for r in rows}) <= 4
    for r in rows:
        assert (r.n_matches > 0) == (r.is_dup == 1)


def test_mmr_diverse_topk_semantics(spark, sf_dir):
    """Per query: exactly MMR_K picks with ranks 1..K, rank 1 is the pure
    relevance argmax, and no pick repeats."""
    from cocktails_data_engineering_spark.operators.curation import (
        MMR_K,
        mmr_diverse_topk,
    )
    from cocktails_data_engineering_spark.operators.similarity import cosine_topk

    per_q: dict[int, list] = {}
    for r in mmr_diverse_topk(spark, sf_dir).collect():
        per_q.setdefault(r.query_id, []).append(r)
    assert per_q
    top1 = {
        r.query_id: r.vec_id
        for r in cosine_topk(spark, sf_dir).collect()
        if r.rank == 1
    }
    for qid, rs in per_q.items():
        assert sorted(r.rank for r in rs) == list(range(1, MMR_K + 1)), qid
        assert len({r.vec_id for r in rs}) == MMR_K, qid
        rank1 = next(r for r in rs if r.rank == 1)
        assert rank1.vec_id == top1[qid], qid


def test_dsir_importance_resample_invariants(spark, sf_dir):
    from cocktails_data_engineering_spark.operators.curation import (
        DSIR_TARGET_LANG,
        dsir_importance_resample,
    )

    rows = {r["lang"]: r for r in dsir_importance_resample(spark, sf_dir).collect()}
    # keep set is a subset of the corpus, never empty-by-construction
    for r in rows.values():
        assert 0 <= r["n_kept"] <= r["n_docs"]
    # the target language must score the highest mean importance ratio
    tgt = rows[DSIR_TARGET_LANG]["mean_lr"]
    for lang, r in rows.items():
        if lang != DSIR_TARGET_LANG:
            assert tgt > r["mean_lr"], (lang, tgt, r["mean_lr"])


def test_dsir_keeps_target_like_docs_drops_alien_vocabulary(spark, tmp_path):
    """Separated vocabularies: every en doc uses the target vocabulary,
    every zh doc a disjoint one.  Importance ratio must keep ALL en docs
    (ratio > 1 -> keep prob 1) and drop most zh docs (ratio << 1)."""
    import os

    from cocktails_data_engineering_spark.operators.curation import (
        dsir_importance_resample,
    )

    rows = []
    for i in range(30):
        rows.append((i, "alpha beta gamma delta", "en", "web", 22))
    for i in range(30, 60):
        rows.append((i, "omega sigma tau kappa", "zh", "web", 20))
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(1).write.mode("overwrite").parquet(
        os.path.join(str(tmp_path), "documents.parquet")
    )
    out = {r["lang"]: r for r in dsir_importance_resample(spark, str(tmp_path)).collect()}
    assert out["en"]["n_kept"] == out["en"]["n_docs"] == 30
    assert out["zh"]["n_kept"] < 10  # ratio << 1: most alien docs dropped
    assert out["en"]["mean_lr"] > 0 > out["zh"]["mean_lr"]


def test_el2n_deciles_partition_and_order(spark, sf_dir):
    """The ten deciles partition the training set and mean EL2N rises
    with the decile index (boundaries are order statistics)."""
    from pyspark.sql import functions as F

    from cocktails_data_engineering_spark.operators.curation import (
        el2n_prune_deciles,
    )
    from cocktails_data_engineering_spark.sources.tables import load

    rows = sorted(el2n_prune_deciles(spark, sf_dir).collect(), key=lambda r: r.decile)
    n_orders = load(spark, sf_dir, "orders").count()
    assert sum(r.n for r in rows) == n_orders
    means = [r.mean_el2n for r in rows]
    assert all(a <= b for a, b in zip(means, means[1:])), means


def test_cdc_chunks_survive_insertion_aligned_blocks_do_not(spark):
    """The CDC op's reason to exist: after a single word is INSERTED near
    the front of a long document, content-defined boundaries re-sync and
    the pair still shares >= CDC_MATCH_MIN chunk hashes, while the
    fixed-position quarters all shift and stop matching."""
    from cocktails_data_engineering_spark.operators.dedup import (
        CDC_MATCH_MIN,
        cdc_chunk_pairs_from,
    )

    base = " ".join(f"tok{i}xq" for i in range(400))
    inserted = " ".join(["tok0xq", "INSERTEDWORD"] + base.split(" ")[1:])
    docs = spark.createDataFrame(
        [(1, base), (2, inserted), (3, " ".join(f"other{i}zz" for i in range(400)))],
        "doc_id long, text string",
    )
    pairs = {(r.doc_a, r.doc_b): r.n_shared for r in cdc_chunk_pairs_from(docs).collect()}
    assert (1, 2) in pairs, f"insertion broke CDC matching: {pairs}"
    assert pairs[(1, 2)] >= CDC_MATCH_MIN
    assert all(k == (1, 2) for k in pairs), f"unrelated doc paired: {pairs}"
