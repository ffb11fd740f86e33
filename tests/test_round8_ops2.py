"""Semantic invariants for the late round-8 operators — properties the
DuckDB value oracle cannot distinguish from coincidence (an oracle match
proves both engines agree, not that the math means what the docstring
claims)."""

from __future__ import annotations

import math

from cocktails_data_engineering_spark.plans import queries as plans


def _rows(spark, sf_dir, name):
    return plans.all_queries()[name](spark, sf_dir).collect()


def test_temperature_weights_normalize_and_flatten(spark, sf_dir):
    """Each alpha column sums to ~1, and alpha=0.3 must FLATTEN the
    mixture: every below-average source gets boosted (w_a03 > w_raw),
    every above-average source damped, and the spread of w_a03 is
    strictly narrower than w_raw's."""
    rows = _rows(spark, sf_dir, "temperature_mixture_weights")
    for col in ("w_raw", "w_a03", "w_a07"):
        assert abs(sum(r[col] for r in rows) - 1.0) < 1e-3, col
    spread = lambda c: max(r[c] for r in rows) - min(r[c] for r in rows)
    if spread("w_raw") > 1e-6:  # sf0.001 has equal per-source counts
        assert spread("w_a03") < spread("w_a07") < spread("w_raw")
    else:
        assert spread("w_a03") <= spread("w_a07") <= spread("w_raw") + 1e-12
    mean_raw = 1.0 / len(rows)
    for r in rows:
        if r.w_raw < mean_raw:
            assert r.boost_a03 > 1.0, r
        elif r.w_raw > mean_raw:
            assert r.boost_a03 < 1.0, r


def test_rho_selection_takes_a_quartile(spark, sf_dir):
    """Rank-based top-quartile: total selected is N//4 up to tie spill
    (a tied group shares a bucket), and every priority's sel_rate is a
    valid proportion."""
    rows = _rows(spark, sf_dir, "rho_loss_selection")
    n = sum(r.n_train for r in rows)
    k = sum(r.n_selected for r in rows)
    assert k >= n // 4 - 1  # rank cut can only spill OVER on ties
    assert k <= n  # sanity
    for r in rows:
        assert 0.0 <= r.sel_rate <= 1.0


def test_doremi_weights_normalize_and_order_by_excess(spark, sf_dir):
    """Alphas sum to ~1 and are monotone in the clipped excess loss (the
    multiplicative-weights update is order-preserving)."""
    rows = _rows(spark, sf_dir, "doremi_domain_reweight")
    assert abs(sum(r.alpha for r in rows) - 1.0) < 1e-3
    by_excess = sorted(rows, key=lambda r: (r.excess, r.alpha))
    alphas = [r.alpha for r in by_excess]
    assert alphas == sorted(alphas)
    for r in rows:
        assert r.excess >= 0.0


def test_token_budget_caps_and_conserves(spark, sf_dir):
    """Per source: effective = min(target, 4x available); targets sum to
    ~the stated budget (floor slack ≤ 1 token per source)."""
    rows = _rows(spark, sf_dir, "token_budget_epoch_plan")
    total = sum(r.n_tokens for r in rows)
    budget = 2 * total
    tsum = sum(r.target_tokens for r in rows)
    assert budget - len(rows) - budget * 1e-3 <= tsum <= budget + budget * 1e-3
    for r in rows:
        assert r.effective_tokens == min(r.target_tokens, 4 * r.n_tokens)
        assert r.epochs <= 4.0 + 1e-9


def test_spearman_rho_is_a_correlation(spark, sf_dir):
    rows = _rows(spark, sf_dir, "spearman_entropy_fluency")
    assert len(rows) == 1
    assert -1.0 <= rows[0].spearman_rho <= 1.0
    assert rows[0].n_docs > 0


def test_hits_scores_are_l1_normalized(spark, sf_dir):
    rows = _rows(spark, sf_dir, "hits_hub_authority")
    assert abs(sum(r.hub for r in rows) - 1.0) < 1e-6
    assert abs(sum(r.authority for r in rows) - 1.0) < 1e-6
    assert all(r.hub >= 0 and r.authority >= 0 for r in rows)


def test_rerank_is_exact_topk_of_shortlist(spark, sf_dir):
    """Within each query's result: ranks are 1..k dense by exact_d2 with
    vec_id tiebreak, and exact_d2 is non-negative."""
    rows = _rows(spark, sf_dir, "ivfadc_rerank_topk")
    byq = {}
    for r in rows:
        byq.setdefault(r.query_id, []).append(r)
    for q, rs in byq.items():
        rs.sort(key=lambda r: r.rank)
        assert [r.rank for r in rs] == list(range(1, len(rs) + 1)), q
        keys = [(r.exact_d2, r.vec_id) for r in rs]
        assert keys == sorted(keys), q
        assert all(r.exact_d2 >= 0 for r in rs), q


def test_estimate_audit_error_is_bounded_and_exact_cols_consistent(spark, sf_dir):
    """abs_err = |est - exact| by recomputation; estimator lives in
    [0, 1]; 128-perm MinHash concentration keeps the mean error small."""
    rows = _rows(spark, sf_dir, "minhash_jaccard_estimate_audit")
    assert rows
    for r in rows:
        assert 0.0 <= r.est_jaccard <= 1.0
        assert 0.0 <= r.exact_jaccard <= 1.0
        assert math.isclose(r.abs_err, abs(r.est_jaccard - r.exact_jaccard), abs_tol=1e-12)
    mean_err = sum(r.abs_err for r in rows) / len(rows)
    assert mean_err < 0.15, f"estimator badly calibrated: {mean_err}"


def test_dedup_preview_counts_are_coherent(spark, sf_dir):
    r = _rows(spark, sf_dir, "dedup_rate_preview")[0]
    assert 0 <= r.sample_dups <= r.sample_n <= r.full_n
    assert 0 <= r.full_dups <= r.full_n
    assert 0.0 <= r.wilson_low <= r.wilson_high <= 1.0
    assert r.wilson_low <= r.sample_rate <= r.wilson_high
