"""Bucketed co-located joins: writing both join sides bucketed by the join
key lets the sort-merge join read pre-partitioned data with NO shuffle —
the 100 TB technique for repeated large-fact joins.  The assertion is on
the physical plan: zero Exchange operators inside the join."""

from __future__ import annotations

import io
from contextlib import redirect_stdout

from pyspark.sql import functions as F

from cocktails_data_engineering_spark.sources.tables import load

N_BUCKETS = 8


def test_bucketed_join_has_no_shuffle(spark, sf_dir):
    orders = load(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")

    spark.sql("DROP TABLE IF EXISTS bkt_orders")
    spark.sql("DROP TABLE IF EXISTS bkt_lineitem")
    (
        orders.write.mode("overwrite")
        .bucketBy(N_BUCKETS, "o_orderkey")
        .sortBy("o_orderkey")
        .saveAsTable("bkt_orders")
    )
    (
        li.write.mode("overwrite")
        .bucketBy(N_BUCKETS, "l_orderkey")
        .sortBy("l_orderkey")
        .saveAsTable("bkt_lineitem")
    )

    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")  # force SMJ
    try:
        joined = spark.table("bkt_orders").join(
            spark.table("bkt_lineitem"),
            F.col("o_orderkey") == F.col("l_orderkey"),
        )
        buf = io.StringIO()
        with redirect_stdout(buf):
            joined.explain("formatted")
        plan = buf.getvalue()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, "bucketed join must not shuffle"
        assert "Bucketed: true" in plan

        # and it returns the same result as the unbucketed join
        expected = orders.join(li, F.col("o_orderkey") == F.col("l_orderkey")).count()
        assert joined.count() == expected
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS bkt_orders")
        spark.sql("DROP TABLE IF EXISTS bkt_lineitem")
