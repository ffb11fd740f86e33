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
