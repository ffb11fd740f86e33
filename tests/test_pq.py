"""Product-quantization contracts: code validity, reconstruction-error
optimality, and ADC recall vs the exact scan (the encode itself is
value-checked against DuckDB by the oracle parity test)."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from cocktails_data_engineering_spark.operators import pq


def test_codes_valid_and_complete(spark, sf_dir):
    vecs = pq._vectors(spark, sf_dir)
    n_vecs = vecs.count()
    enc = pq.encode(vecs, pq.codebook(vecs))
    rows = enc.collect()
    assert len(rows) == n_vecs * pq.M, "one code per (vector, subspace)"
    for r in rows[:500]:
        assert 0 <= r["code"] < pq.K
        assert 0 <= r["m"] < pq.M
        assert r["d2"] >= 0.0


def test_refinement_reduces_total_error(spark, sf_dir):
    """One Lloyd round must not increase total reconstruction error
    (assign→update→reassign is monotone non-increasing), and for the seed
    codebook every seed reconstructs itself with exactly zero error."""
    vecs = pq._vectors(spark, sf_dir)
    cb0 = pq.seed_codebook(vecs)
    err0_rows = pq.encode(vecs, cb0).agg(F.sum("d2")).collect()
    err1_rows = pq.encode(vecs, pq.refine(vecs, cb0)).agg(F.sum("d2")).collect()
    err0, err1 = err0_rows[0][0], err1_rows[0][0]
    assert err1 <= err0 + 1e-6, f"refinement increased error: {err0} -> {err1}"
    # seeds self-encode under the seed codebook
    per_vec0 = (
        pq.encode(vecs, cb0)
        .groupBy("vec_id")
        .agg(F.sum("d2").alias("e"))
        .filter(F.col("e") == 0.0)
        .count()
    )
    assert per_vec0 >= pq.K, f"expected ≥{pq.K} zero-error seeds, got {per_vec0}"


def test_encode_is_argmin(spark, sf_dir):
    """The chosen code minimizes subspace distance over all K candidates."""
    vecs = pq._vectors(spark, sf_dir)
    cb = pq.codebook(vecs)
    first_id = vecs.agg(F.min("vec_id")).collect()[0][0]
    one = vecs.filter(F.col("vec_id") == first_id)
    chosen = {r["m"]: r["code"] for r in pq.encode(one, cb).collect()}
    alld = (
        pq._subspaces(one)
        .join(F.broadcast(cb), "m")
        .select("m", "code", pq._d2("s_emb", "c_emb").alias("d2"))
        .collect()
    )
    best = {}
    for r in alld:
        if r["m"] not in best or (r["d2"], r["code"]) < best[r["m"]][1]:
            best[r["m"]] = (r["code"], (r["d2"], r["code"]))
    for m, code in chosen.items():
        assert best[m][0] == code, f"subspace {m}: picked {code}, best {best[m][0]}"


def test_adc_recall_vs_exact(spark, sf_dir):
    """ADC over 8-byte codes must stay close to the exact L2 scan: mean
    recall@k well above the ~1% chance floor."""
    vecs = pq._vectors(spark, sf_dir).cache()
    approx = pq.pq_adc_topk(spark, sf_dir).collect()

    # mirror pq_adc_topk's fixed probe slice (ADC_PROBE_CAP) so the exact
    # baseline covers the same query set at ANY fixture scale
    q = vecs.filter(
        (F.col("vec_id") % pq.QUERY_MOD == 0)
        & (F.col("vec_id") < pq.ADC_PROBE_CAP)
    ).select(F.col("vec_id").alias("query_id"), F.col("emb").alias("q_emb"))
    w = Window.partitionBy("query_id").orderBy("d2", "vec_id")
    exact = (
        vecs.join(F.broadcast(q), F.col("vec_id") != F.col("query_id"))
        .select("query_id", "vec_id", pq._d2("q_emb", "emb").alias("d2"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= pq.TOP_K)
        .collect()
    )
    exact_by_q, approx_by_q = {}, {}
    for r in exact:
        exact_by_q.setdefault(r["query_id"], set()).add(r["vec_id"])
    for r in approx:
        approx_by_q.setdefault(r["query_id"], set()).add(r["vec_id"])
    assert set(approx_by_q) == set(exact_by_q)
    recalls = [
        len(approx_by_q[qid] & exact_by_q[qid]) / len(exact_by_q[qid])
        for qid in exact_by_q
    ]
    mean_recall = sum(recalls) / len(recalls)
    # Untrained 16-code codebook: modest but far above the chance floor.
    # The achievable recall shrinks with corpus size (same 8-byte code
    # resolution, more near-collisions to rank through), so the bar is
    # 0.2 on the small fixtures and 200x the random-chance floor beyond.
    n_vecs = vecs.count()
    chance = pq.TOP_K / max(1, n_vecs - 1)
    thr = 0.2 if n_vecs <= 1000 else max(0.02, 10 * chance)
    assert mean_recall >= thr, (
        f"mean recall@{pq.TOP_K} {mean_recall:.3f} < {thr:.3f} (n={n_vecs})"
    )


def test_ivfadc_recall_vs_exhaustive_adc(spark, sf_dir):
    """IVFADC restricts the exhaustive ADC scan to nprobe inverted
    lists; under the SAME distance (ADC over codes) its top-k must
    recover a solid share of the exhaustive scan's top-k — this isolates
    the coarse quantizer's candidate recall from PQ quantization error
    (which test_adc_recall_vs_exact already audits)."""
    full = pq.pq_adc_topk(spark, sf_dir).collect()
    ivf = pq.ivfadc_topk(spark, sf_dir).collect()
    full_by_q, ivf_by_q = {}, {}
    for r in full:
        full_by_q.setdefault(r["query_id"], set()).add(r["vec_id"])
    for r in ivf:
        # ivfadc probes ALL %QUERY_MOD queries; the exhaustive audit runs
        # only the ADC_PROBE_CAP slice — compare on the common set
        if r["query_id"] < pq.ADC_PROBE_CAP:
            ivf_by_q.setdefault(r["query_id"], set()).add(r["vec_id"])
    assert set(ivf_by_q) == set(full_by_q)  # every audited query answered
    recalls = [
        len(ivf_by_q[q] & full_by_q[q]) / len(full_by_q[q]) for q in full_by_q
    ]
    mean_recall = sum(recalls) / len(recalls)
    assert mean_recall >= 0.5, mean_recall  # nprobe=2 of a dynamic-K index


def test_residual_quantization_beats_raw(spark, sf_dir):
    """The reason residual encoding exists: residuals (v - coarse
    centroid) have magnitudes bounded by cell radius, so the same
    {M}x{K} codebook quantizes them with LESS total reconstruction error
    than raw vectors."""
    from cocktails_data_engineering_spark.operators.clustering import (
        _assign,
        _init_centroids_dyn,
        _update,
        dyn_k,
    )

    vecs = pq._vectors(spark, sf_dir)
    raw_err = (
        pq.encode(vecs, pq.codebook(vecs)).agg(F.sum("d2").alias("e")).collect()[0]["e"]
    )
    cents1 = _update(_assign(vecs, _init_centroids_dyn(vecs, dyn_k(vecs.count()))))
    lists = _assign(vecs, cents1).select("vec_id", "cid")
    rvecs = (
        lists.join(vecs, "vec_id")
        .join(F.broadcast(cents1), "cid")
        .select("vec_id", F.zip_with("emb", "cemb", lambda x, y: x - y).alias("emb"))
    )
    res_err = (
        pq.encode(rvecs, pq.codebook(rvecs)).agg(F.sum("d2").alias("e")).collect()[0]["e"]
    )
    assert res_err < raw_err, (res_err, raw_err)
