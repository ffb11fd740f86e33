"""Partition-count independence: the engine's results must not depend on
the cluster's parallelism.  At 100 TB the same query runs across 32, 200,
or 5000 reducers depending on AQE and cluster size; any operator whose
output shifts with ``spark.sql.shuffle.partitions`` is silently wrong at
scale even if every fixed-parallelism oracle check passes.

The queries below are the ones whose histories earned the decimal /
round-before-reuse disciplines (float accumulation order, window frames,
driver-collected scalars, LSH bucket assembly) — each runs under the
default 32 shuffle partitions and again under an adversarial 5, and the
full sorted result sets must match exactly.
"""

from __future__ import annotations

import pytest

from cocktails_data_engineering_spark.plans import queries as plans

# order/accumulation-sensitive representatives, one per discipline family
SENSITIVE = (
    "q1_pricing_summary",  # DECIMAL dsum accumulation
    "ewma_daily_revenue",  # integer-weight triangular join
    "bootstrap_ci_order_value",  # replica explode + partial aggregates
    "logistic_regression_gd",  # driver-collected gradient scalars
    "minhash_near_dedup",  # 128-way MIN aggregate + band buckets
    "kmeans_embeddings",  # rounded Lloyd rounds, DECIMAL partials
    "winnowing_fingerprint_pairs",  # partitioned windowed minima
    "el2n_prune_deciles",  # percentile boundary broadcast
    "roc_auc_orders",  # two-phase ordered running sums
    "pagerank_crawl_graph",  # per-round rounded DECIMAL sums
    "rho_loss_selection",  # two split-trained GD models + rank quartiles
    "doremi_domain_reweight",  # DECIMAL NLL means + exp/normalize chain
    "ivfadc_rerank_topk",  # ADC shortlist + ordered-fold exact rerank
    "hits_hub_authority",  # per-round DECIMAL L1 normalization
    # round-10 additions
    "lsh_band_plan_curve",  # 120-way band census aggregation
    "adaptive_banding_dedup",  # census-driven choice + banded self-join
    "maxsim_late_interaction",  # fold dot products + per-query pools
    "unimax_epoch_weights",  # unpartitioned waterfill windows
)


def _rows(spark, sf_dir, name):
    df = plans.all_queries()[name](spark, sf_dir)
    return sorted(tuple(r) for r in df.collect())


@pytest.mark.parametrize("name", SENSITIVE)
def test_result_identical_under_5_shuffle_partitions(spark, sf_dir, name):
    from cocktails_data_engineering_spark import caching
    from cocktails_data_engineering_spark.operators import ml

    base = _rows(spark, sf_dir, name)
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    # force retraining / signature + index rebuild under the altered parallelism
    ml._TRAIN_CACHE.clear()
    caching.clear(spark)
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "5")
        alt = _rows(spark, sf_dir, name)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
        ml._TRAIN_CACHE.clear()
        caching.clear(spark)
    assert alt == base, f"{name}: result depends on shuffle partition count"
