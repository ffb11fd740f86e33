"""Semantic checks for the model-evaluation / drift family — properties
the oracle differential cannot express (bounds, monotonicity, identities)."""

from __future__ import annotations

import math

from cocktails_data_engineering_spark.operators import evaluation
from cocktails_data_engineering_spark.operators.dedup import aligned_block_dedup
from cocktails_data_engineering_spark.operators.evaluation import (
    gain_deciles_orders,
    ks_statistic_status,
    ordered_running_sums,
    psi_price_drift,
    roc_auc_orders,
)
from cocktails_data_engineering_spark.operators.ml import assoc_rules_brands


def test_auc_within_bounds_and_matches_bruteforce(spark, sf_dir):
    row = roc_auc_orders(spark, sf_dir).collect()[0]
    assert row.n_pos > 0 and row.n_neg > 0
    assert 0.0 <= row.auc <= 1.0
    # brute-force U on the small SF: P(score_pos > score_neg) + 0.5 ties
    from cocktails_data_engineering_spark.sources.tables import load

    rows = load(spark, sf_dir, "orders").select("o_orderstatus", "o_totalprice").collect()
    pos = sorted(r.o_totalprice for r in rows if r.o_orderstatus == "F")
    neg = sorted(r.o_totalprice for r in rows if r.o_orderstatus != "F")
    import bisect

    u2 = 0
    for s in pos:
        below = bisect.bisect_left(neg, s)
        ties = bisect.bisect_right(neg, s) - below
        u2 += 2 * below + ties
    expect = round(u2 / (2.0 * len(pos) * len(neg)), 6)
    assert math.isclose(row.auc, expect, abs_tol=1e-9)


def test_ks_within_bounds(spark, sf_dir):
    row = ks_statistic_status(spark, sf_dir).collect()[0]
    assert 0.0 <= row.ks <= 1.0


def test_gain_deciles_monotone(spark, sf_dir):
    rows = sorted(gain_deciles_orders(spark, sf_dir).collect(), key=lambda r: r.decile)
    assert [r.decile for r in rows] == list(range(1, len(rows) + 1))
    gains = [r.cum_gain for r in rows]
    assert gains == sorted(gains)  # cumulative gain is non-decreasing
    assert math.isclose(gains[-1], 1.0, abs_tol=1e-9)  # full ranking captures all


def test_psi_reference_month_is_zero(spark, sf_dir):
    rows = psi_price_drift(spark, sf_dir).collect()
    ref = min(r.month for r in rows)
    by_month = {r.month: r.psi for r in rows}
    assert by_month[ref] == 0.0
    assert all(p >= 0.0 for p in by_month.values())


def test_ordered_running_sums_matches_window(spark, sf_dir):
    import pyspark.sql.functions as F

    df = spark.range(1000).select(
        (F.col("id") * 7919 % 1000).alias("k"), F.lit(1).alias("one")
    ).distinct()
    got = {
        r.k: r.cum_one for r in ordered_running_sums(df, "k", ["one"]).collect()
    }
    keys = sorted(got)
    for rank, k in enumerate(keys, start=1):
        assert got[k] == rank  # inclusive cumsum of 1s == rank in key order


def test_assoc_rules_metrics_consistent(spark, sf_dir):
    rows = assoc_rules_brands(spark, sf_dir).collect()
    assert rows, "expected at least one brand pair"
    for r in rows:
        assert r.brand_a < r.brand_b
        assert 0.0 < r.support <= 1.0
        assert 0.0 < r.confidence <= 1.0
        assert r.lift > 0.0
    lifts = [r.lift for r in rows]
    assert lifts == sorted(lifts, reverse=True)


def test_aligned_block_dedup_pairs_share_blocks(spark, sf_dir):
    import pyspark.sql.functions as F

    from cocktails_data_engineering_spark.sources.tables import load

    pairs = aligned_block_dedup(spark, sf_dir).collect()
    if not pairs:  # sf0.001 may hold no near-dups; the sf0.01 oracle run does
        return
    texts = {
        r.doc_id: r.text
        for r in load(spark, sf_dir, "documents")
        .filter(
            F.col("doc_id").isin(
                [p.doc_a for p in pairs] + [p.doc_b for p in pairs]
            )
        )
        .collect()
    }
    for p in pairs:
        wa, wb = texts[p.doc_a].split(" "), texts[p.doc_b].split(" ")
        qa, qb = (len(wa) + 3) // 4, (len(wb) + 3) // 4
        n = sum(
            1
            for i in range(4)
            if wa[i * qa : i * qa + qa] == wb[i * qb : i * qb + qb]
        )
        assert n == p.n_blocks and n >= 2


def test_model_monitoring_pipeline_composes_parts(spark, sf_dir):
    from cocktails_data_engineering_spark.operators.evaluation import (
        model_monitoring_pipeline,
    )

    rows = {r.metric: r.value for r in model_monitoring_pipeline(spark, sf_dir).collect()}
    assert set(rows) == {"roc_auc", "ks_statistic", "psi_max", "gain_top_decile"}
    auc = roc_auc_orders(spark, sf_dir).collect()[0].auc
    assert rows["roc_auc"] == auc  # flagship reuses the part verbatim
    assert all(v is not None for v in rows.values())


def test_ndcg_within_bounds(spark, sf_dir):
    from cocktails_data_engineering_spark.operators.evaluation import ndcg_orders

    r = ndcg_orders(spark, sf_dir).collect()[0]
    assert 0.0 <= r.ndcg <= 1.0
    assert r.dcg <= r.idcg


def test_rrf_fuses_both_rankings(spark, sf_dir):
    from cocktails_data_engineering_spark.operators.lexical import (
        RRF_K,
        rrf_hybrid_retrieval,
    )

    rows = rrf_hybrid_retrieval(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.rank_lex is not None or r.rank_sem is not None
        expect = sum(
            1.0 / (RRF_K + rk) for rk in (r.rank_lex, r.rank_sem) if rk is not None
        )
        assert abs(r.rrf - round(expect, 6)) < 1e-9
    # fused ordering is by rrf desc (list overlap is data-dependent, so
    # only the ordering and the formula are asserted)
    rrfs = [r.rrf for r in rows]
    assert rrfs == sorted(rrfs, reverse=True)


def test_degree_assortativity_in_range(spark, sf_dir):
    from cocktails_data_engineering_spark.operators.graph import degree_assortativity

    r = degree_assortativity(spark, sf_dir).collect()[0]
    assert -1.0 <= r.assortativity <= 1.0
