"""Semantic invariants (beyond the oracle diff) for the round-6 batch:
EWMA closed form, ACF bounds, streak accounting, Adamic-Adar structure,
and JL distortion concentration."""

from __future__ import annotations

from pyspark.sql import functions as F

from cocktails_data_engineering_spark.operators.graph import (
    AA_TOP_K,
    adamic_adar_link_prediction,
)
from cocktails_data_engineering_spark.operators.similarity import (
    JL_OUT_DIM,
    jl_projection_distortion,
)
from cocktails_data_engineering_spark.operators.timeseries import (
    ACF_MAX_LAG,
    acf_daily_events,
    ewma_daily_revenue,
    user_active_day_streaks,
)
from cocktails_data_engineering_spark.sources.tables import load


def test_ewma_first_day_equals_actual(spark, sf_dir):
    """S_1 = y_1: the smoothing recursion's base case survives the
    closed-form rewrite."""
    rows = ewma_daily_revenue(spark, sf_dir).collect()
    by_type: dict[str, list] = {}
    for r in rows:
        by_type.setdefault(r.event_type, []).append(r)
    for t, rs in by_type.items():
        first = min(rs, key=lambda r: r.day)
        assert abs(first.ewma - first.actual) < 1e-6, (t, first)
        # smoothing is a convex combination: every EWMA lies inside the
        # running [min, max] of actuals seen so far
        rs_sorted = sorted(rs, key=lambda r: r.day)
        lo = hi = rs_sorted[0].actual
        for r in rs_sorted:
            lo, hi = min(lo, r.actual), max(hi, r.actual)
            assert lo - 1e-4 <= r.ewma <= hi + 1e-4, (t, r)


def test_acf_bounds_and_lags(spark, sf_dir):
    rows = acf_daily_events(spark, sf_dir).collect()
    assert sorted(r.lag for r in rows) == list(range(1, ACF_MAX_LAG + 1))
    for r in rows:
        assert -1.0 - 1e-9 <= r.acf <= 1.0 + 1e-9, r
        assert r.n_pairs > 0


def test_streaks_cover_all_active_users(spark, sf_dir):
    dist = user_active_day_streaks(spark, sf_dir).collect()
    n_users = sum(r.n_users for r in dist)
    truth = load(spark, sf_dir, "events").select("user_id").distinct().count()
    assert n_users == truth
    for r in dist:
        assert r.streak_len >= 1


def test_adamic_adar_predictions_are_nonedges_in_block(spark, sf_dir):
    rows = adamic_adar_link_prediction(spark, sf_dir).collect()
    assert 0 < len(rows) <= AA_TOP_K
    orders = load(spark, sf_dir, "orders")
    base = orders.select(
        (F.col("o_orderkey") % 500).alias("a"),
        (
            50 * F.floor((F.col("o_orderkey") % 500) / 50).cast("bigint")
            + (F.col("o_custkey") % 50)
        ).alias("b"),
    )
    edges = {
        (r.a, r.b)
        for r in base.unionAll(
            base.select(F.col("b").alias("a"), F.col("a").alias("b"))
        )
        .distinct()
        .collect()
    }
    for r in rows:
        assert r.u < r.v
        assert (r.u, r.v) not in edges, r  # predicted links are non-edges
        assert r.u // 50 == r.v // 50, r  # blocks are disconnected
        assert r.aa_score > 0 and r.n_common >= 1


def test_jl_distortion_concentrates_near_one(spark, sf_dir):
    """JL bound: with d_out={JL_OUT_DIM} the distortion ratio has spread
    ~sqrt(2/{JL_OUT_DIM}) ≈ 0.35, so the pair-weighted mean sits near 1
    and the bulk lands within ±3σ."""
    rows = jl_projection_distortion(spark, sf_dir).collect()
    n = sum(r.n_pairs for r in rows)
    mean = sum(r.mean_ratio * r.n_pairs for r in rows) / n
    assert 0.85 <= mean <= 1.15, mean
    within = sum(r.n_pairs for r in rows if 0 <= r.bucket / 10.0 <= 2.0)
    assert within / n >= 0.95, within / n


def test_gini_split_beats_parent_impurity(spark, sf_dir):
    """Any admissible split must not exceed the parent node's Gini; with
    a ~1/3 positive rate the parent impurity is ~0.444."""
    from cocktails_data_engineering_spark.operators.ml import gini_best_split

    rows = gini_best_split(spark, sf_dir).collect()
    assert {r.feature for r in rows} == {"quantity", "discount_pct"}
    li = load(spark, sf_dir, "lineitem")
    n = li.count()
    npos = li.filter(F.col("l_returnflag") == "R").count()
    p = npos / n
    parent = 1.0 - p * p - (1.0 - p) * (1.0 - p)
    for r in rows:
        assert r.n_left > 0 and r.n_right > 0
        assert r.gini_split <= parent + 1e-9, (r, parent)


def test_calibration_bins_consistency(spark, sf_dir):
    from cocktails_data_engineering_spark.operators.evaluation import (
        calibration_reliability_bins,
    )

    rows = calibration_reliability_bins(spark, sf_dir).collect()
    n_total = sum(r.n for r in rows)
    assert n_total == load(spark, sf_dir, "orders").count()
    for r in rows:
        assert 0 <= r.bin <= 9
        assert 0.0 <= r.mean_p <= 1.0 and 0.0 <= r.frac_pos <= 1.0
        assert abs(r.calib_gap - abs(r.mean_p - r.frac_pos)) < 2e-6, r


def test_knn_accuracy_accounting(spark, sf_dir):
    from cocktails_data_engineering_spark.operators.similarity import (
        QUERY_MOD,
        knn_label_accuracy,
    )

    rows = knn_label_accuracy(spark, sf_dir).collect()
    n_queries = sum(r.n_queries for r in rows)
    truth = (
        load(spark, sf_dir, "embeddings")
        .filter(F.col("vec_id") % QUERY_MOD == 0)
        .count()
    )
    assert n_queries == truth
    for r in rows:
        assert 0 <= r.n_correct <= r.n_queries
        assert abs(r.accuracy - r.n_correct / r.n_queries) < 1e-6


def test_bootstrap_ci_brackets_point_mean(spark, sf_dir):
    from cocktails_data_engineering_spark.operators.profiling import (
        bootstrap_ci_order_value,
    )

    row = bootstrap_ci_order_value(spark, sf_dir).collect()[0]
    assert row.ci_lo <= row.point_mean <= row.ci_hi, row
    # replica spread should be small relative to the mean (n is large)
    assert (row.ci_hi - row.ci_lo) / row.point_mean < 0.05, row
