"""Convergence and determinism of the k-means operator (rows-only query —
these assertions are its correctness contract)."""

from __future__ import annotations

from cocktails_data_engineering_spark.operators import clustering


def test_lloyd_inertia_non_increasing(spark, sf_dir):
    vecs = clustering._vectors(spark, sf_dir)
    _, inertia = clustering.lloyd(vecs, n_rounds=4)
    assert len(inertia) == 4
    for earlier, later in zip(inertia, inertia[1:]):
        # rounding distances to 6 decimals can cost at most ~n * 1e-6
        assert later <= earlier + 1e-3
    assert inertia[-1] < inertia[0]  # it actually improved


def test_ivf_recall_vs_exact(spark, sf_dir):
    """IVF top-k must recover a decent fraction of the exact top-k (the
    fixture's 64-dim word-soup embeddings cluster weakly, so the bar is
    deliberately conservative), and every IVF hit must carry the same
    score the exact path assigns (same rounding, same arithmetic)."""
    from cocktails_data_engineering_spark.operators.similarity import cosine_topk

    exact = {
        (r["query_id"], r["vec_id"]): r["score"]
        for r in cosine_topk(spark, sf_dir).collect()
    }
    approx = {
        (r["query_id"], r["vec_id"]): r["score"]
        for r in clustering.ivf_cosine_topk(spark, sf_dir).collect()
    }
    assert approx, "IVF returned nothing"
    hits = set(exact) & set(approx)
    recall = len(hits) / len(exact)
    assert recall >= 0.3, f"recall {recall:.2f}"
    for key in hits:
        assert exact[key] == approx[key]


def test_kmeans_summary_deterministic_and_complete(spark, sf_dir):
    r1 = clustering.kmeans_embeddings(spark, sf_dir).collect()
    r2 = clustering.kmeans_embeddings(spark, sf_dir).collect()
    assert [tuple(r) for r in r1] == [tuple(r) for r in r2]
    assert 1 <= len(r1) <= clustering.K
    n_vecs = clustering._vectors(spark, sf_dir).count()
    assert sum(r["n_members"] for r in r1) == n_vecs


def test_kcenter_coreset_greedy_invariants(spark, sf_dir):
    """Farthest-point traversal: 8 distinct centers, sel_d2 non-increasing
    (each pick covers the previous worst gap), and every later pick's
    distance is positive (no duplicate vectors chosen)."""
    from cocktails_data_engineering_spark.operators.clustering import (
        kcenter_coreset_sample,
    )

    rows = sorted(
        kcenter_coreset_sample(spark, sf_dir).collect(), key=lambda r: r.step
    )
    assert [r.step for r in rows] == list(range(1, 9))
    assert len({r.center_id for r in rows}) == 8
    dists = [r.sel_d2 for r in rows[1:]]
    assert all(a >= b for a, b in zip(dists, dists[1:])), dists
    assert all(d > 0 for d in dists)


def test_ivf_plan_curve_census_laws(spark, sf_dir):
    """Sizing-planner invariants: one row per candidate nlist; cells used
    never exceeds nlist; probe mass is monotone in nprobe and bounded by
    the whole sample; imbalance >= 1 (Cauchy-Schwarz: nlist * sum(share^2)
    is 1.0 exactly when cells are perfectly balanced); a larger nlist
    never scans a LARGER fraction at nprobe=1."""
    from cocktails_data_engineering_spark.operators.clustering import (
        PLAN_NLISTS,
        ivf_index_plan_curve,
    )

    rows = sorted(
        ivf_index_plan_curve(spark, sf_dir).collect(), key=lambda r: r.nlist
    )
    assert [r.nlist for r in rows] == list(PLAN_NLISTS)
    for r in rows:
        assert 1 <= r.n_cells_used <= r.nlist
        assert 0 < r.max_cell_share <= 1
        assert r.imbalance_factor >= 0.999999, r
        assert 0 < r.scan_frac_p1 <= r.scan_frac_p2 <= r.scan_frac_p4 <= 1
    fracs1 = [r.scan_frac_p1 for r in rows]
    assert all(a >= b for a, b in zip(fracs1, fracs1[1:])), fracs1
