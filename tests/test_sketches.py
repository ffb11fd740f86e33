"""Semantic checks for the sketch layer (approximate → no value oracle):
estimate accuracy vs exact, and the merge property that justifies storing
sketches at all."""

from __future__ import annotations

from pyspark.sql import functions as F

from cocktails_data_engineering_spark.operators.sketches import (
    _LG_K,
    approx_topk_words,
    hll_distinct_by_type,
)
from cocktails_data_engineering_spark.sources.tables import load


def test_hll_estimates_within_tolerance(spark, sf_dir):
    rows = hll_distinct_by_type(spark, sf_dir).collect()
    got = {r.event_type: (r.exact_users, r.within_bound) for r in rows}
    events = load(spark, sf_dir, "events")
    exact_rows = events.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("n")
    ).collect()
    exact = {r.event_type: r.n for r in exact_rows}
    exact["__all__"] = events.select("user_id").distinct().count()
    assert set(got) == set(exact)
    for k, n in exact.items():
        assert got[k][0] == n, (k, got[k], n)
        # lgK=14 → ~0.8% RSE; the contract bound (3·rse) is >3 sigma
        assert got[k][1], (k, got[k], n)


def test_hll_union_equals_direct_sketch(spark, sf_dir):
    """Union of per-group sketches must estimate exactly what one global
    sketch over the raw data estimates (HLL union = per-register max, so
    the merged register state is identical) — the property that lets a
    deployment store per-day sketches and never rescan history."""
    events = load(spark, sf_dir, "events")
    merged = (
        events.groupBy("event_type")
        .agg(F.hll_sketch_agg("user_id", F.lit(_LG_K)).alias("sk"))
        .agg(F.hll_union_agg("sk").alias("sk"))
        .select(F.hll_sketch_estimate("sk").alias("est"))
        .collect()[0]
        .est
    )
    direct = (
        events.agg(F.hll_sketch_agg("user_id", F.lit(_LG_K)).alias("sk"))
        .select(F.hll_sketch_estimate("sk").alias("est"))
        .collect()[0]
        .est
    )
    assert merged == direct


def test_approx_topk_matches_exact_head(spark, sf_dir):
    """With maxItemsTracked far above the true vocabulary head, the sketch's
    counts are exact and its membership is a valid top-20 under ties —
    so every emitted row must carry n == exact count and within_bound."""
    rows = approx_topk_words(spark, sf_dir).collect()
    exact_rows = (
        load(spark, sf_dir, "documents")
        .select(F.explode(F.split(F.lower(F.col("text")), " ")).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .count()
        .collect()
    )
    exact = {r.word: r["count"] for r in exact_rows}
    kth = sorted(exact.values(), reverse=True)[min(19, len(exact) - 1)]
    assert len(rows) == min(20, len(exact))
    for r in rows:
        assert exact[r.word] == r.n, (r.word, r.n, exact.get(r.word))
        assert r.n >= kth  # every reported member belongs to a valid top-20
        assert r.within_bound, (r.word, r.n)


def test_block_checksum_invariant_under_repartition(spark, sf_dir):
    """The checksum must be a pure function of table CONTENT: any
    partitioning/shuffle order (the thing that varies across cluster
    sizes) yields identical blocks — that's what makes it usable for
    cross-deployment reconciliation."""
    from cocktails_data_engineering_spark.operators.sketches import block_checksum_orders

    base = {r.block: (r.n_rows, r.checksum) for r in block_checksum_orders(spark, sf_dir).collect()}
    orders = load(spark, sf_dir, "orders").repartition(13)
    import tempfile

    shuffled_dir = tempfile.mkdtemp(prefix="cksum_shuffled_")
    orders.write.mode("overwrite").parquet(shuffled_dir + "/orders.parquet")
    for other in ("region", "nation", "customer", "supplier", "part", "lineitem",
                  "events", "documents", "embeddings"):
        # checksum only reads orders; point the rest at the originals
        import os
        os.symlink(f"{sf_dir}/{other}.parquet", f"{shuffled_dir}/{other}.parquet")
    again = {
        r.block: (r.n_rows, r.checksum)
        for r in block_checksum_orders(spark, shuffled_dir).collect()
    }
    assert base == again


def test_hll_rolling_7d_within_tolerance(spark, sf_dir, duck):
    from cocktails_data_engineering_spark.operators.sketches import hll_rolling_7d_users

    got = {
        r.day: (r.exact_users_7d, r.within_bound)
        for r in hll_rolling_7d_users(spark, sf_dir).collect()
    }
    exact = dict(
        duck.execute(
            """
            WITH days AS (SELECT DISTINCT date_trunc('day', ts) AS day FROM events)
            SELECT strftime(d.day, '%Y-%m-%d') AS day,
                   (SELECT COUNT(DISTINCT e.user_id) FROM events e
                    WHERE date_trunc('day', e.ts) BETWEEN d.day - INTERVAL 6 DAY AND d.day)
            FROM days d
            """
        ).fetchall()
    )
    assert set(got) == set(exact)
    for day, n in exact.items():
        assert got[day][0] == n, (day, got[day], n)
        assert got[day][1], (day, got[day], n)


def test_countmin_overcount_one_sided(spark, sf_dir):
    from cocktails_data_engineering_spark.operators.sketches import countmin_word_freq

    rows = countmin_word_freq(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.cm_estimate >= r.true_count  # CMS never undercounts
        assert r.overcount == r.cm_estimate - r.true_count


def test_bloom_prefilter_no_false_negatives(spark, sf_dir):
    import pyspark.sql.functions as F

    from cocktails_data_engineering_spark.operators.sketches import (
        BLOOM_NATION,
        bloom_prefilter_join,
    )
    from cocktails_data_engineering_spark.sources.tables import load

    row = bloom_prefilter_join(spark, sf_dir).collect()[0]
    # exact ground truth: orders of customers in the filtered nation
    cust = load(spark, sf_dir, "customer").filter(
        F.col("c_nationkey") == BLOOM_NATION
    )
    exact = (
        load(spark, sf_dir, "orders")
        .join(cust, F.col("o_custkey") == F.col("c_custkey"), "left_semi")
        .count()
    )
    assert row.n_true_match == exact  # every true match passes the bloom
    assert row.n_pass_bloom == row.n_true_match + row.n_false_pos
    assert row.n_pass_bloom <= row.n_orders
