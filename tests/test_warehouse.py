"""Structural contracts of the warehouse-maintenance operators (exact
values are covered by the oracle parity test; these pin the invariants
that must hold even if the simulation constants change)."""

from __future__ import annotations

from collections import defaultdict

from pyspark.sql import functions as F

from cocktails_data_engineering_spark.operators import warehouse
from cocktails_data_engineering_spark.sources.tables import load


def test_scd2_intervals_contiguous_and_alternating(spark, sf_dir):
    rows = warehouse.scd2_user_state(spark, sf_dir).collect()
    assert rows
    by_user = defaultdict(list)
    for r in rows:
        by_user[r["user_id"]].append(r)
    for user, runs in by_user.items():
        runs.sort(key=lambda r: r["version"])
        # versions are dense starting at 1 (first event always opens a run)
        assert [r["version"] for r in runs] == list(range(1, len(runs) + 1)), user
        # exactly one open (current) interval, and it is the last one
        assert [r["is_current"] for r in runs] == [0] * (len(runs) - 1) + [1], user
        for a, b in zip(runs, runs[1:]):
            # contiguous validity: each interval closes where the next opens
            assert a["valid_to"] == b["valid_from"], user
            # a run only ends when the state actually changes
            assert a["state"] != b["state"], user
        assert runs[-1]["valid_to"] is None


def test_snapshot_diff_classes_reconcile(spark, sf_dir):
    orders = load(spark, sf_dir, "orders")
    n_del = orders.filter(F.col("o_orderkey") % warehouse.DEL_MOD == 0).count()
    n_add = orders.filter(F.col("o_orderkey") % warehouse.ADD_MOD == 0).count()
    n_chg = orders.filter(
        (F.col("o_orderkey") % warehouse.DEL_MOD != 0)
        & (F.col("o_orderkey") % warehouse.CHG_MOD == 0)
    ).count()
    total = orders.count()

    out = {r["diff_class"]: r for r in warehouse.snapshot_diff_orders(spark, sf_dir).collect()}
    assert set(out) == {"added", "removed", "changed", "unchanged"}
    assert out["removed"]["n_rows"] == n_del
    assert out["added"]["n_rows"] == n_add
    assert out["changed"]["n_rows"] == n_chg
    assert out["unchanged"]["n_rows"] == total - n_del - n_chg
    # every changed row moved by exactly +CHG_PRICE_DELTA (delta is exact in
    # binary double, and the DECIMAL sum keeps it exact in aggregate)
    assert out["changed"]["price_delta"] == warehouse.CHG_PRICE_DELTA * n_chg
    assert out["unchanged"]["price_delta"] == 0.0
    # added keys live in their own key space
    assert out["added"]["min_key"] >= warehouse.ADD_KEY_OFFSET
    assert out["removed"]["max_key"] < warehouse.ADD_KEY_OFFSET


def test_incremental_merge_equals_full_recompute(spark, sf_dir):
    merged = {
        (r["l_returnflag"], r["l_linestatus"]): r
        for r in warehouse.incremental_agg_merge(spark, sf_dir).collect()
    }
    li = load(spark, sf_dir, "lineitem")
    direct = {
        (r["l_returnflag"], r["l_linestatus"]): r
        for r in li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(F.col("l_quantity").cast("decimal(18,6)")).cast("double").alias("sum_qty"),
        )
        .collect()
    }
    assert set(merged) == set(direct)
    for k in direct:
        assert merged[k]["n_rows"] == direct[k]["n_rows"], k
        # DECIMAL partials are associative: merge == recompute, bit-exact
        assert merged[k]["sum_qty"] == direct[k]["sum_qty"], k


def test_zone_map_covers_table_and_orders_ranges(spark, sf_dir):
    rows = warehouse.zone_map_orders_monthly(spark, sf_dir).collect()
    assert rows
    orders = load(spark, sf_dir, "orders")
    assert sum(r["n_rows"] for r in rows) == orders.count()
    for r in rows:
        assert r["min_key"] <= r["max_key"]
        assert r["min_price"] <= r["max_price"]
        assert 1 <= r["n_priorities"] <= 5


def test_skew_stats_shares_and_mean(spark, sf_dir):
    rows = warehouse.partition_skew_stats(spark, sf_dir).collect()
    assert 1 <= len(rows) <= warehouse.N_BUCKETS
    assert abs(sum(r["share"] for r in rows) - 1.0) < 1e-3
    mean_skew = sum(r["skew_factor"] for r in rows) / len(rows)
    assert abs(mean_skew - 1.0) < 1e-3
    for r in rows:
        assert r["skew_factor"] > 0


def test_scd2_point_in_time_join_is_total_and_unique(spark, sf_dir):
    """Every purchase matches EXACTLY ONE dimension version (the PIT
    invariant: validity intervals partition each user's timeline), and
    the joined state is the purchase's own event_type run."""
    from pyspark.sql import functions as F

    from cocktails_data_engineering_spark.operators.warehouse import (
        scd2_point_in_time_join,
    )
    from cocktails_data_engineering_spark.sources.tables import load

    out = scd2_point_in_time_join(spark, sf_dir)
    n_purchases = (
        load(spark, sf_dir, "events").filter(F.col("event_type") == "purchase").count()
    )
    assert out.count() == n_purchases  # total
    assert out.select("event_id").distinct().count() == n_purchases  # unique
    # a purchase event's valid interval is a 'purchase' run by construction
    assert out.filter(F.col("state") != "purchase").count() == 0


def test_cdc_replay_semantics(spark, sf_dir):
    """Replay-order semantics: a key deleted by batch 1 is gone unless
    batch 2 re-upserts it; batch-2 prices include batch-1's reprice only
    where batch 2 did not overwrite."""
    from pyspark.sql import functions as F

    from cocktails_data_engineering_spark.operators.pipeline import (
        cdc_replay_reconstruct,
    )
    from cocktails_data_engineering_spark.sources.tables import load

    out = cdc_replay_reconstruct(spark, sf_dir)
    base = load(spark, sf_dir, "orders")
    # deleted in b1 (k%1000==7), NOT re-upserted by b2 (k%15!=0) → absent
    gone = out.filter(
        (F.col("o_orderkey") % 1000 == 7) & (F.col("o_orderkey") % 15 != 0)
    )
    assert gone.count() == 0
    # deleted in b1 but re-upserted by b2 → present again
    n_reinserted_expected = base.filter(
        (F.col("o_orderkey") % 1000 == 7) & (F.col("o_orderkey") % 15 == 0)
    ).count()
    reinserted = out.filter(
        (F.col("o_orderkey") % 1000 == 7) & (F.col("o_orderkey") % 15 == 0)
    ).count()
    assert reinserted == n_reinserted_expected
    # deleted in b2 → always absent (no later batch)
    assert out.filter(F.col("o_orderkey") % 1000 == 13).count() == 0


def test_ivm_join_delta_matches_direct_join(spark, sf_dir):
    import pyspark.sql.functions as F

    from cocktails_data_engineering_spark.functions.numerics import DEC
    from cocktails_data_engineering_spark.operators.warehouse import ivm_join_delta
    from cocktails_data_engineering_spark.sources.tables import load

    got = {r.month: (r.n_lines, r.revenue) for r in ivm_join_delta(spark, sf_dir).collect()}
    o = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    direct = (
        o.join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy(
            F.date_format(F.date_trunc("month", "o_orderdate"), "yyyy-MM").alias("month")
        )
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.round(
                F.sum((F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(DEC))
                .cast("double"),
                6,
            ).alias("revenue"),
        )
    )
    want = {r.month: (r.n_lines, r.revenue) for r in direct.collect()}
    assert got == want
