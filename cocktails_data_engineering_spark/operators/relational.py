"""Relational query surface (SURVEY.md §2.3): scan/filter/project, joins,
aggregation, rollup/cube, windows, sort/limit, set ops, JSON, time windows.

The reference project has no aggregation/window/join engine at all (its only
joins are the implicit visited-set anti-join, ``scripts/spiders/
web_spider_oo.py:98-101``, and the degenerate literal cross product at
``:316``); this module supplies the full relational surface its README-stated
downstream analytics ("display the data in a small web app") would need,
expressed declaratively so Catalyst plans pushdown/broadcast/AQE for free.

Scale notes are attached per query; the common rules:

- filters/projections are written directly against the scan so they push
  into the parquet reader (check: ``PushedFilters`` in ``.explain``),
- small dims join via explicit ``broadcast()`` (no shuffle of the fact),
- double sums go through DECIMAL (see ``functions/numerics.py``) making
  results independent of partitioning/aggregation order — required both for
  the DuckDB oracle and for run-to-run stability on a 1000-executor cluster.
"""

from __future__ import annotations
import os


from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.numerics import DEC, dsum, oracle_davg, oracle_dsum
from ..registry import register
from ..sources.tables import load, load_dim, load_spread


# ---------------------------------------------------------------------------
# Flagship: TPC-H Q1-shaped pricing summary (scan → filter → agg → sort)
# ---------------------------------------------------------------------------
Q1_ORACLE = f"""
SELECT
  l_returnflag,
  l_linestatus,
  {oracle_dsum('l_quantity')} AS sum_qty,
  {oracle_dsum('l_extendedprice')} AS sum_base_price,
  {oracle_dsum('l_extendedprice * (1 - l_discount)')} AS sum_disc_price,
  {oracle_dsum('l_extendedprice * (1 - l_discount) * (1 + l_tax)')} AS sum_charge,
  {oracle_davg('l_quantity')} AS avg_qty,
  {oracle_davg('l_extendedprice')} AS avg_price,
  {oracle_davg('l_discount')} AS avg_disc,
  COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '2000-12-01 00:00:00'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


@register("q1_pricing_summary", oracle=Q1_ORACLE)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pricing summary report: the flagship scan→filter→agg→sort query.

    Scale: partial+final hash agg on 6 groups; the shipdate filter and
    7-column projection push into the parquet scan (through the spread
    repartition), so at 100 TB only the needed columns are read.  The
    seven DECIMAL accumulations are compute-heavy, so the scan is spread
    across the session's parallelism when the input has too few splits
    (no-op on real multi-split inputs — see tables.load_spread).
    """
    li = load_spread(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    # avg_qty/avg_price reuse sum_qty/sum_base_price post-agg (davg is
    # EXACTLY dsum/count, so deriving the average from the same decimal
    # sum and per-column count is bit-identical) — 5 decimal
    # accumulations per row instead of 7; the decimal casts are q1's
    # dominant per-row cost.
    agged = (
        li.filter(F.col("l_shipdate") <= F.lit("2000-12-01 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum(F.col("l_quantity")).alias("sum_qty"),
            dsum(F.col("l_extendedprice")).alias("sum_base_price"),
            dsum(disc_price).alias("sum_disc_price"),
            dsum(charge).alias("sum_charge"),
            dsum(F.col("l_discount")).alias("_sum_disc"),
            F.count(F.col("l_quantity")).alias("_n_qty"),
            F.count(F.col("l_extendedprice")).alias("_n_price"),
            F.count(F.col("l_discount")).alias("_n_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )
    return (
        agged.select(
            "l_returnflag",
            "l_linestatus",
            "sum_qty",
            "sum_base_price",
            "sum_disc_price",
            "sum_charge",
            (F.col("sum_qty") / F.col("_n_qty")).alias("avg_qty"),
            (F.col("sum_base_price") / F.col("_n_price")).alias("avg_price"),
            (F.col("_sum_disc") / F.col("_n_disc")).alias("avg_disc"),
            "count_order",
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


# ---------------------------------------------------------------------------
# Scan + projection + filter pushdown
# ---------------------------------------------------------------------------
@register(
    "scan_project",
    oracle="""
SELECT l_orderkey, l_partkey, l_extendedprice
FROM lineitem
WHERE l_quantity >= 48.0
""",
)
def scan_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column-pruned, predicate-pushed scan (reference's document-store read
    analog, web_spider_oo.py:352-365 → parquet).

    Scale: `.explain` must show ReadSchema with exactly 4 columns and
    PushedFilters [GreaterThanOrEqual(l_quantity,48.0)] — no full-table read.
    """
    return (
        load(spark, sf_dir, "lineitem")
        .filter(F.col("l_quantity") >= 48.0)
        .select("l_orderkey", "l_partkey", "l_extendedprice")
    )


# ---------------------------------------------------------------------------
# Joins: anti / semi / equi / broadcast
# ---------------------------------------------------------------------------
@register(
    "anti_join_visited",
    oracle="""
SELECT c_custkey, c_name
FROM customer c
WHERE NOT EXISTS (
  SELECT 1 FROM orders o
  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 250000.0
)
""",
)
def anti_join_visited(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-anti join — the visited-set dedup of the crawl frontier
    (web_spider_oo.py:98-101) generalized: customers with no large order.

    Scale: anti join shuffles both sides on the key; with AQE a small
    build side flips to broadcast automatically.
    """
    cust = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 250000.0)
    return cust.join(orders, cust.c_custkey == orders.o_custkey, "left_anti").select(
        "c_custkey", "c_name"
    )


@register(
    "semi_join_active",
    oracle="""
SELECT c_custkey, c_name
FROM customer c
WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
""",
)
def semi_join_active(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-semi join — complement of the visited-set anti join."""
    cust = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders")
    return cust.join(orders, cust.c_custkey == orders.o_custkey, "left_semi").select(
        "c_custkey", "c_name"
    )


@register(
    "equi_join_vertex_resolve",
    oracle="""
SELECT o.o_orderkey, c.c_name, n.n_name
FROM orders o
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
WHERE o.o_totalprice > 400000.0
""",
)
def equi_join_vertex_resolve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-join chain — the edge-table ⋈ vertex-table resolution the
    reference's indexing/unique_links tables are built for
    (web_spider_oo.py:316-326): resolve keys to names across tables.

    Scale: nation broadcasts (25 rows at any SF); orders⋈customer is the
    real shuffle and the totalprice filter pushes below it.
    """
    orders = load(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 400000.0)
    cust = load(spark, sf_dir, "customer")
    nation = load_dim(spark, sf_dir, "nation")
    return (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .join(nation, cust.c_nationkey == nation.n_nationkey)
        .select("o_orderkey", "c_name", "n_name")
    )


@register(
    "broadcast_join_dims",
    oracle=f"""
SELECT r.r_name, n.n_name,
       {oracle_dsum('l.l_extendedprice * (1 - l.l_discount)')} AS revenue,
       COUNT(*) AS n_items
FROM lineitem l
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN nation n ON s.s_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
GROUP BY r.r_name, n.n_name
ORDER BY r.r_name, n.n_name
""",
)
def broadcast_join_dims(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Star join with explicit broadcast of every dimension: revenue by
    region/nation (TPC-H Q5 shape).

    Scale: with supplier/nation/region broadcast, the plan is a single
    pass over lineitem with zero fact-table shuffles before the final
    26-group aggregation — the canonical 100 TB star-join strategy.
    """
    li = load(spark, sf_dir, "lineitem")
    supp = F.broadcast(load(spark, sf_dir, "supplier"))
    nation = load_dim(spark, sf_dir, "nation")
    region = load_dim(spark, sf_dir, "region")
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(supp, li.l_suppkey == supp.s_suppkey)
        .join(nation, supp.s_nationkey == nation.n_nationkey)
        .join(region, nation.n_regionkey == region.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(dsum(revenue).alias("revenue"), F.count(F.lit(1)).alias("n_items"))
        .orderBy("r_name", "n_name")
    )


# ---------------------------------------------------------------------------
# Set operations (frontier union / distinct of the crawl, O10/O13 + family)
# ---------------------------------------------------------------------------
@register(
    "union_frontier",
    oracle="""
SELECT c_custkey FROM customer WHERE c_mktsegment = 'AUTOMOBILE'
UNION
SELECT o_custkey AS c_custkey FROM orders WHERE o_totalprice > 300000.0
""",
)
def union_frontier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """union().distinct() — the per-level frontier merge
    (web_spider_oo.py:121,135)."""
    cust = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders")
    a = cust.filter(F.col("c_mktsegment") == "AUTOMOBILE").select("c_custkey")
    b = (
        orders.filter(F.col("o_totalprice") > 300000.0)
        .select(F.col("o_custkey").alias("c_custkey"))
    )
    return a.union(b).distinct()


@register(
    "intersect_segments",
    oracle="""
SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
INTERSECT
SELECT o_custkey AS c_custkey FROM orders
""",
)
def intersect_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT (distinct semantics)."""
    cust = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders")
    return (
        cust.filter(F.col("c_mktsegment") == "BUILDING")
        .select("c_custkey")
        .intersect(orders.select(F.col("o_custkey").alias("c_custkey")))
    )


@register(
    "except_unvisited",
    oracle="""
SELECT c_custkey FROM customer
EXCEPT
SELECT o_custkey AS c_custkey FROM orders WHERE o_orderstatus = 'F'
""",
)
def except_unvisited(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT (distinct semantics) — set-difference form of the frontier
    minus visited computation."""
    cust = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    return cust.select("c_custkey").subtract(orders.select(F.col("o_custkey").alias("c_custkey")))


@register(
    "distinct_links",
    oracle="SELECT DISTINCT lang, source FROM documents",
)
def distinct_links(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DISTINCT — the reference's pervasive set semantics
    (web_spider_oo.py:87,300)."""
    return load(spark, sf_dir, "documents").select("lang", "source").distinct()


# ---------------------------------------------------------------------------
# Aggregation breadth
# ---------------------------------------------------------------------------
@register(
    "groupby_agg_depth",
    oracle=f"""
SELECT o_orderstatus,
       COUNT(*) AS n_orders,
       COUNT(DISTINCT o_custkey) AS n_customers,
       {oracle_dsum('o_totalprice')} AS total_price
FROM orders
GROUP BY o_orderstatus
ORDER BY o_orderstatus
""",
)
def groupby_agg_depth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """count / countDistinct per group — the crawl-stats query over the
    reference's depth-stamped edge table (web_spider_oo.py:318).

    Two-level plan: mixing countDistinct with plain aggregates makes
    Catalyst rewrite through an Expand that doubles the scanned rows;
    pre-aggregating to the (status, custkey) grain (counts + DECIMAL
    partials, map-side combined) and finishing on the distinct grain
    computes the identical values — n_customers is the second level's
    COUNT of the (non-null) custkey grouping column, so a NULL-custkey
    group still feeds n_orders/total_price but is excluded from the
    distinct count exactly as COUNT(DISTINCT) excludes NULLs (ADVICE
    r11: o_custkey is NOT NULL on TPC-H, but the rewrite must stay
    equivalent under nullable keys) — with no Expand (measured
    0.64s → 0.47s at sf0.1)."""
    base = (
        load(spark, sf_dir, "orders")
        .groupBy("o_orderstatus", "o_custkey")
        .agg(
            F.count(F.lit(1)).alias("_n"),
            F.sum(F.col("o_totalprice").cast(DEC)).alias("_tp"),
        )
    )
    return (
        base.groupBy("o_orderstatus")
        .agg(
            F.sum("_n").alias("n_orders"),
            F.count(F.col("o_custkey")).alias("n_customers"),
            F.sum("_tp").cast("double").alias("total_price"),
        )
        .orderBy("o_orderstatus")
    )


@register(
    "agg_multi",
    oracle=f"""
SELECT COUNT(*) AS n_rows,
       {oracle_dsum('l_extendedprice')} AS sum_price,
       {oracle_davg('l_extendedprice')} AS avg_price,
       MIN(l_extendedprice) AS min_price,
       MAX(l_extendedprice) AS max_price,
       {oracle_dsum('l_quantity')} AS sum_qty,
       strftime(MIN(l_shipdate), '%Y-%m-%d %H:%M:%S') AS min_shipdate_str,
       strftime(MAX(l_shipdate), '%Y-%m-%d %H:%M:%S') AS max_shipdate_str
FROM lineitem
""",
)
def agg_multi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global multi-aggregate: sum/avg/min/max/count over measures and
    timestamps (README's price-analytics intent)."""
    li = load(spark, sf_dir, "lineitem")
    # avg_price derives post-agg from the SAME decimal sum (davg is
    # exactly dsum/count) — one fewer per-row decimal accumulation.
    agged = li.agg(
        F.count(F.lit(1)).alias("n_rows"),
        dsum(F.col("l_extendedprice")).alias("sum_price"),
        F.count(F.col("l_extendedprice")).alias("_n_price"),
        F.min("l_extendedprice").alias("min_price"),
        F.max("l_extendedprice").alias("max_price"),
        dsum(F.col("l_quantity")).alias("sum_qty"),
        F.date_format(F.min("l_shipdate"), "yyyy-MM-dd HH:mm:ss").alias("min_shipdate_str"),
        F.date_format(F.max("l_shipdate"), "yyyy-MM-dd HH:mm:ss").alias("max_shipdate_str"),
    )
    return agged.select(
        "n_rows",
        "sum_price",
        (F.col("sum_price") / F.col("_n_price")).alias("avg_price"),
        "min_price",
        "max_price",
        "sum_qty",
        "min_shipdate_str",
        "max_shipdate_str",
    )


@register(
    "rollup_priority_status",
    oracle=f"""
SELECT o_orderpriority, o_orderstatus,
       COUNT(*) AS n_orders,
       {oracle_dsum('o_totalprice')} AS total_price
FROM orders
GROUP BY ROLLUP (o_orderpriority, o_orderstatus)
""",
)
def rollup_priority_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP BY ROLLUP — hierarchical subtotals.

    Same two-level shape as cube_flag_status: base aggregate to the
    (priority, status) grain with DECIMAL partials, ROLLUP's Expand over
    the ~15 base rows — exact by decimal-sum associativity."""
    base = (
        load(spark, sf_dir, "orders")
        .groupBy("o_orderpriority", "o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("_n"),
            F.sum(F.col("o_totalprice").cast(DEC)).alias("_sp"),
        )
    )
    return base.rollup("o_orderpriority", "o_orderstatus").agg(
        F.sum("_n").alias("n_orders"),
        F.sum("_sp").cast("double").alias("total_price"),
    )


@register(
    "cube_flag_status",
    oracle=f"""
SELECT l_returnflag, l_linestatus,
       COUNT(*) AS n_items,
       {oracle_dsum('l_quantity')} AS sum_qty
FROM lineitem
GROUP BY CUBE (l_returnflag, l_linestatus)
""",
)
def cube_flag_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP BY CUBE — all grouping-set combinations.

    Two-level plan: one base aggregate to the (flag, status) grain keeps
    the DECIMAL partials, then the CUBE's Expand runs over those ~6 rows
    instead of multiplying the fact scan by 4 grouping sets (a direct
    cube pays the per-row decimal cast once per grouping set).  Exact:
    decimal sums are associative, so summing per-group partials and
    casting to double at the END is bit-identical to the single-level
    dsum — the same reasoning the map-side partial aggregation relies
    on, applied across grouping sets."""
    base = (
        load(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.count(F.lit(1)).alias("_n"),
            F.sum(F.col("l_quantity").cast(DEC)).alias("_sq"),
        )
    )
    return base.cube("l_returnflag", "l_linestatus").agg(
        F.sum("_n").alias("n_items"),
        F.sum("_sq").cast("double").alias("sum_qty"),
    )


@register(
    "pivot_priority_by_status",
    oracle="""
SELECT o_orderpriority,
       COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS status_f,
       COUNT(*) FILTER (WHERE o_orderstatus = 'O') AS status_o,
       COUNT(*) FILTER (WHERE o_orderstatus = 'P') AS status_p
FROM orders
GROUP BY o_orderpriority
ORDER BY o_orderpriority
""",
)
def pivot_priority_by_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot (long→wide): order counts per priority by status.

    Explicit value list keeps the plan a single pass (no values-discovery
    job) — required at scale.
    """
    df = (
        load(spark, sf_dir, "orders")
        .groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .count()
        .orderBy("o_orderpriority")
    )
    renamed = df.select(
        "o_orderpriority",
        F.coalesce(F.col("F"), F.lit(0)).alias("status_f"),
        F.coalesce(F.col("O"), F.lit(0)).alias("status_o"),
        F.coalesce(F.col("P"), F.lit(0)).alias("status_p"),
    )
    return renamed


@register(
    "unpivot_measures",
    oracle="""
SELECT l_orderkey, l_linenumber, measure, value
FROM (
  SELECT l_orderkey, l_linenumber, 'quantity' AS measure, l_quantity AS value FROM lineitem
  UNION ALL
  SELECT l_orderkey, l_linenumber, 'discount' AS measure, l_discount AS value FROM lineitem
) t
WHERE l_orderkey % 100 = 0
""",
)
def unpivot_measures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot (wide→long) via stack()."""
    return (
        load(spark, sf_dir, "lineitem")
        .filter(F.col("l_orderkey") % 100 == 0)
        .selectExpr(
            "l_orderkey",
            "l_linenumber",
            "stack(2, 'quantity', l_quantity, 'discount', l_discount) AS (measure, value)",
        )
    )


# ---------------------------------------------------------------------------
# Window functions
# ---------------------------------------------------------------------------
@register(
    "window_rank_topk",
    oracle="""
SELECT c_nationkey, c_custkey, c_acctbal, rk
FROM (
  SELECT c_nationkey, c_custkey, c_acctbal,
         ROW_NUMBER() OVER (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey) AS rk
  FROM customer
) t
WHERE rk <= 3
""",
)
def window_rank_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k per group via row_number — the reference's enumerate-ids shape
    (web_spider_oo.py:325) generalized to ranked top-k (README's
    top-prices-per-venue intent).

    Scale: one shuffle on the partition key; Spark pushes a per-partition
    top-k (WindowGroupLimit) before the full sort at this filter shape.
    """
    w = Window.partitionBy("c_nationkey").orderBy(F.col("c_acctbal").desc(), F.col("c_custkey"))
    return (
        load(spark, sf_dir, "customer")
        .select("c_nationkey", "c_custkey", "c_acctbal", F.row_number().over(w).alias("rk"))
        .filter(F.col("rk") <= 3)
    )


@register(
    "window_running",
    oracle=f"""
SELECT o_custkey, o_orderkey,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6)))
            OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_total,
       LAG(o_orderkey) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS prev_orderkey,
       LEAD(o_orderkey) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS next_orderkey
FROM orders
""",
)
def window_running(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running total + lag/lead over a deterministic total order.

    The running SUM accumulates in DECIMAL so the result is identical under
    any window evaluation strategy (running vs segment-tree).
    """
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return load(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_orderkey",
        F.sum(F.col("o_totalprice").cast(DEC))
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .cast("double")
        .alias("running_total"),
        F.lag("o_orderkey").over(w).alias("prev_orderkey"),
        F.lead("o_orderkey").over(w).alias("next_orderkey"),
    )


def assign_dense_ids(df: DataFrame, key: str, id_name: str = "link_id") -> DataFrame:
    """zipWithIndex-style two-phase dense ID assignment by sort order of a
    UNIQUE ``key`` — no single-partition window anywhere.

    Phase 1: range-repartition on the key (global order across partitions
    is then the concatenation of per-partition orders) and rank locally
    within each partition.  Phase 2: per-partition counts → cumulative
    offsets (a table of n_partitions rows — the only single-partition
    step, on O(partitions) data) broadcast-joined back.

    IDs are identical to ``row_number() over (order by key) - 1`` for any
    range boundary placement, because range partitioning preserves global
    key order.
    """
    n_parts = int(df.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    parts = df.repartitionByRange(n_parts, F.col(key)).withColumn(
        "_pid", F.spark_partition_id()
    )
    local_w = Window.partitionBy("_pid").orderBy(key)
    local = parts.withColumn("_local", F.row_number().over(local_w) - 1)
    counts = local.groupBy("_pid").agg(F.count(F.lit(1)).alias("_n"))
    # Cumulative offsets via a triangular self-join over the O(partitions)
    # count table — no global window anywhere in the plan.
    a = counts.alias("a")
    b = counts.alias("b")
    offsets = (
        a.join(b, F.col("b._pid") < F.col("a._pid"), "left")
        .groupBy(F.col("a._pid").alias("_pid"))
        .agg(F.coalesce(F.sum("b._n"), F.lit(0)).alias("_offset"))
    )
    return local.join(F.broadcast(offsets), "_pid").select(
        (F.col("_local") + F.col("_offset")).alias(id_name), key
    )


@register(
    "enumerate_ids",
    oracle="""
SELECT ROW_NUMBER() OVER (ORDER BY link_name) - 1 AS link_id, link_name
FROM (SELECT DISTINCT source AS link_name FROM documents) t
""",
)
def enumerate_ids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dense ID assignment — deterministic replacement for the reference's
    ``enumerate(set)`` (web_spider_oo.py:321-326, quirk Q3 in SURVEY §2.1),
    equal to ``row_number() over (order by name) - 1`` but computed with
    the two-phase :func:`assign_dense_ids` so no single-partition window
    exists at any vertex-set size."""
    distinct_names = (
        load(spark, sf_dir, "documents").select(F.col("source").alias("link_name")).distinct()
    )
    return assign_dense_ids(distinct_names, "link_name").select("link_id", "link_name")


@register(
    "sort_limit_topk",
    oracle="""
SELECT l_orderkey, l_linenumber, l_extendedprice
FROM lineitem
ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber
LIMIT 100
""",
)
def sort_limit_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-k: ORDER BY ... LIMIT k.

    Scale: Spark plans TakeOrderedAndProject — per-partition heap top-k,
    then a k-row merge on the driver; no global sort materializes.
    """
    return (
        load(spark, sf_dir, "lineitem")
        .orderBy(F.col("l_extendedprice").desc(), "l_orderkey", "l_linenumber")
        .limit(100)
        .select("l_orderkey", "l_linenumber", "l_extendedprice")
    )


# ---------------------------------------------------------------------------
# JSON + event-time windows (events table)
# ---------------------------------------------------------------------------
@register(
    "json_extract_props",
    oracle="""
SELECT event_id, event_type,
       CAST(json_extract_string(props, '$.k') AS BIGINT) AS prop_k
FROM events
WHERE event_type = 'purchase'
""",
)
def json_extract_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON field extraction from the events props column."""
    ev = load(spark, sf_dir, "events").filter(F.col("event_type") == "purchase")
    return ev.select(
        "event_id",
        "event_type",
        F.get_json_object("props", "$.k").cast("bigint").alias("prop_k"),
    )


@register(
    "from_json_struct",
    oracle=f"""
SELECT event_type,
       {oracle_dsum("CAST(json_extract_string(props, '$.k') AS BIGINT)")} AS sum_k,
       COUNT(*) AS n
FROM events
GROUP BY event_type
ORDER BY event_type
""",
)
def from_json_struct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-full JSON parse (from_json → struct) then aggregate."""
    ev = load(spark, sf_dir, "events")
    parsed = ev.select(
        "event_type",
        F.from_json("props", "k BIGINT").alias("p"),
    )
    return (
        parsed.groupBy("event_type")
        .agg(dsum(F.col("p.k")).alias("sum_k"), F.count(F.lit(1)).alias("n"))
        .orderBy("event_type")
    )


@register(
    "date_trunc_hourly",
    oracle=f"""
SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour_start,
       COUNT(*) AS n_events,
       {oracle_dsum('value')} AS sum_value
FROM events
GROUP BY 1
ORDER BY 1
""",
)
def date_trunc_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly rollup via date_trunc (timestamps emitted as strings so the
    comparison is timezone/precision-proof; fixture ts is ns, Spark µs)."""
    ev = load(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.date_format(F.date_trunc("hour", F.col("ts")), "yyyy-MM-dd HH:mm:ss").alias(
                "hour_start"
            )
        )
        .agg(F.count(F.lit(1)).alias("n_events"), dsum(F.col("value")).alias("sum_value"))
        .orderBy("hour_start")
    )


@register(
    "tumbling_window_agg",
    oracle=f"""
SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
       event_type,
       COUNT(*) AS n_events,
       {oracle_dsum('value')} AS sum_value
FROM events
GROUP BY 1, 2
""",
)
def tumbling_window_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling event-time window via F.window — the batch twin of the
    Structured Streaming aggregation (streaming/events.py runs the same
    plan with readStream + watermark)."""
    ev = load(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"), dsum(F.col("value")).alias("sum_value"))
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


@register(
    "sliding_window_agg",
    oracle=f"""
SELECT strftime(date_trunc('hour', ts) - off * INTERVAL 1 HOUR,
                '%Y-%m-%d %H:%M:%S') AS window_start,
       event_type,
       COUNT(*) AS n_events,
       {oracle_dsum('value')} AS sum_value
FROM events CROSS JOIN (SELECT unnest([0, 1]) AS off) offsets
GROUP BY 1, 2
""",
)
def sliding_window_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding (hopping) event-time window: 2-hour windows advancing
    every hour, so each event lands in exactly two overlapping windows.

    ``F.window(ts, '2 hours', '1 hour')`` expands each row into its
    window memberships before the aggregate — duplication factor =
    window/slide = 2, then partial aggregation collapses map-side, so
    shuffle volume stays at |windows × types| per task.  The oracle
    makes the same expansion explicit with a 2-element unnest.  The
    streaming twin is streaming/events.stream_sliding_window_agg.
    """
    ev = load(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "2 hours", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"), dsum(F.col("value")).alias("sum_value"))
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


@register(
    "sessionize_lag_gaps",
    oracle="""
WITH flagged AS (
  SELECT user_id, ts, event_id,
         CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   > INTERVAL 30 MINUTE
              OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
              THEN 1 ELSE 0 END AS new_session
  FROM events
),
sessions AS (
  SELECT user_id,
         CAST(SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              AS BIGINT) AS session_id
  FROM flagged
)
SELECT user_id, session_id, COUNT(*) AS n_events
FROM sessions
GROUP BY user_id, session_id
""",
)
def sessionize_lag_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch sessionization: lag(ts) gap > 30 min starts a new session,
    cumulative sum numbers them (classic window idiom; session_window_agg
    below is the engine-native formulation of the same idea)."""
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap_us = F.unix_micros(F.col("ts")) - F.unix_micros(F.lag("ts").over(w))
    flagged = ev.select(
        "user_id",
        "ts",
        "event_id",
        F.when(F.lag("ts").over(w).isNull() | (gap_us > 1800 * 1_000_000), F.lit(1))
        .otherwise(F.lit(0))
        .alias("new_session"),
    )
    w2 = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    sessions = flagged.select("user_id", F.sum("new_session").over(w2).alias("session_id"))
    return sessions.groupBy("user_id", "session_id").agg(F.count(F.lit(1)).alias("n_events"))


@register(
    "session_window_agg",
    oracle="""
WITH ordered AS (
  SELECT user_id, ts, event_id,
         LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
  FROM events
),
flagged AS (
  SELECT user_id, ts, event_id,
         CASE WHEN prev_ts IS NULL OR ts - prev_ts >= INTERVAL 5 MINUTE
              THEN 1 ELSE 0 END AS new_session
  FROM ordered
),
sessions AS (
  SELECT user_id, ts,
         CAST(SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
  FROM flagged
)
SELECT strftime(MIN(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
       user_id,
       COUNT(*) AS n_events
FROM sessions
GROUP BY user_id, session_id
""",
)
def session_window_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Native session windows (5-minute gap) per user.

    The oracle reproduces session_window's merge rule with the lag-gap
    idiom: per-event windows [ts, ts+gap) merge only when they OVERLAP,
    so an event exactly gap after its predecessor starts a NEW session —
    hence ``>= INTERVAL 5 MINUTE`` (not ``>``) in the oracle's
    new-session flag; session start is the first event's ts.
    tests/test_session_windows.py additionally cross-checks against an
    independent batch sessionization."""
    ev = load(spark, sf_dir, "events")
    return (
        ev.groupBy(F.session_window("ts", "5 minutes").alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("session_start"),
            "user_id",
            "n_events",
        )
    )


@register(
    "approx_distinct_users",
    oracle="""
SELECT event_type,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_users,
       TRUE AS within_bound
FROM events GROUP BY event_type ORDER BY event_type
""",
)
def approx_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_count_distinct (HyperLogLog++) per event type — the sketch
    path for 100 TB cardinality estimation: fixed kilobytes of state per
    group and a map-side-combinable merge, where COUNT(DISTINCT) pays a
    full shuffle of every distinct key.

    Bounded-contract oracle (the approx_percentile_prices pattern): the
    sketch's value is engine-specific, so the emitted columns are the
    exact count plus ``within_bound`` — TRUE iff the HLL++ estimate lies
    within max(3·rsd, 2) of exact (rsd = 0.02; HLL++ is exact in sparse
    mode at small cardinalities, the +2 covers integer granularity).
    The oracle states the contract as a literal TRUE; a sketch
    regression flips the Spark side to FALSE and fails the value hash."""
    ev = load(spark, sf_dir, "events")
    # Pre-dedup (event_type, user_id) once, then ONE simple aggregate:
    # mixing COUNT(DISTINCT) with the sketch in a single agg plans an
    # Expand (per-row duplication per aggregate path); HLL is
    # duplicate-insensitive, so sketching the deduped stream yields the
    # identical estimate with a plain two-stage plan (bench r9: 1.14s →
    # the partial-aggregated distinct shape).
    du = ev.select("event_type", "user_id").distinct()
    agg = du.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("exact_users"),
        F.approx_count_distinct("user_id", 0.02).alias("approx"),
    )
    from .sketches import hll_contract_slack

    return agg.select(
        "event_type",
        "exact_users",
        (
            F.abs(F.col("approx").cast("double") - F.col("exact_users"))
            <= hll_contract_slack(F.col("exact_users"), rse=0.02)
        ).alias("within_bound"),
    ).orderBy("event_type")


@register(
    "listagg_sources_by_lang",
    oracle="""
SELECT lang, COUNT(*) AS n_docs,
       string_agg(DISTINCT source, ',' ORDER BY source) AS sources
FROM documents
GROUP BY lang
ORDER BY lang
""",
)
def listagg_sources_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String aggregation (LISTAGG family): deterministic sorted
    collect_set → concat per group.  Map-side combine applies to the set
    collection; the sort is per-group over the distinct values only."""
    docs = load(spark, sf_dir, "documents")
    return (
        docs.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.concat_ws(",", F.array_sort(F.collect_set("source"))).alias("sources"),
        )
        .orderBy("lang")
    )


@register(
    "percentile_quantiles",
    oracle="""
SELECT l_returnflag,
       CAST(median(l_extendedprice) AS DOUBLE) AS median_price,
       MAX(l_extendedprice) AS max_price
FROM lineitem
GROUP BY l_returnflag
ORDER BY l_returnflag
""",
)
def percentile_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact median per group (Spark `median` ≡ DuckDB `median` for even
    counts: mean of the two middle values).  Median buffers every value
    per group, so the scan is spread first (see tables.load_spread)."""
    return (
        load_spread(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.median("l_extendedprice").alias("median_price"),
            F.max("l_extendedprice").alias("max_price"),
        )
        .orderBy("l_returnflag")
    )


# ---------------------------------------------------------------------------
# Multi-join analytics (TPC-H Q3/Q5 shapes) + subquery + ntile
# ---------------------------------------------------------------------------
@register(
    "q3_shipping_priority",
    oracle=f"""
SELECT l_orderkey,
       {oracle_dsum('l_extendedprice * (1 - l_discount)')} AS revenue,
       strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
       o_orderpriority
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-07-01'
  AND l_shipdate  > TIMESTAMP '1998-07-01'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, l_orderkey
LIMIT 10
""",
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: 3-way join, filtered both sides, revenue agg,
    global top-10.

    Plan notes: both date filters push into the scans; customer is the
    small side (broadcast under AQE); TakeOrderedAndProject caps the
    sort at k rows.  Revenue accumulates in DECIMAL (order-independent).
    """
    cust = load(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = load(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-07-01").cast("timestamp")
    )
    li = load(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-07-01").cast("timestamp")
    )
    return (
        cust.join(orders, F.col("c_custkey") == F.col("o_custkey"))
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"))
        .select(
            "l_orderkey",
            "revenue",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            "o_orderpriority",
        )
        .orderBy(F.col("revenue").desc(), "l_orderkey")
        .limit(10)
    )


@register(
    "q5_local_supplier_volume",
    oracle=f"""
SELECT n_name, {oracle_dsum('l_extendedprice * (1 - l_discount)')} AS revenue
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '2000-01-01'
GROUP BY n_name
ORDER BY revenue DESC, n_name
""",
)
def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: 6-way join (fact + 5 dims/semi-dims) with the
    local-supplier constraint (customer and supplier in the same nation).

    Plan notes: supplier/nation/region broadcast; the only fact-table
    shuffle is the join to orders; Catalyst orders the joins from the
    filtered region outward.
    """
    cust = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("2000-01-01").cast("timestamp"))
    )
    li = load(spark, sf_dir, "lineitem")
    supp = F.broadcast(load(spark, sf_dir, "supplier"))
    nation = load_dim(spark, sf_dir, "nation")
    region = load_dim(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        cust.join(orders, F.col("c_custkey") == F.col("o_custkey"))
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(supp, (F.col("l_suppkey") == F.col("s_suppkey"))
              & (F.col("c_nationkey") == F.col("s_nationkey")))
        .join(nation, F.col("s_nationkey") == F.col("n_nationkey"))
        .join(region, F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("n_name")
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"))
        .orderBy(F.col("revenue").desc(), "n_name")
    )


@register(
    "above_avg_balance_customers",
    oracle="""
WITH nation_avg AS (
  SELECT c_nationkey,
         CAST(SUM(CAST(c_acctbal AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*) AS nation_avg
  FROM customer GROUP BY c_nationkey
)
SELECT c_custkey, c_name, c_acctbal, ROUND(nation_avg, 6) AS nation_avg
FROM customer JOIN nation_avg USING (c_nationkey)
WHERE c_acctbal > nation_avg
""",
)
def above_avg_balance_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar-subquery shape: customers above their nation's average
    balance.  The per-nation average is a tiny aggregate broadcast back
    against the full table; the average is computed through exact DECIMAL
    so the > comparison cannot flip on last-ulp differences between
    engines."""
    cust = load(spark, sf_dir, "customer")
    nation_avg = (
        cust.groupBy("c_nationkey")
        .agg(
            (F.sum(F.col("c_acctbal").cast(DEC)).cast("double") / F.count(F.lit(1))).alias(
                "nation_avg"
            )
        )
    )
    return (
        cust.join(F.broadcast(nation_avg), "c_nationkey")
        .filter(F.col("c_acctbal") > F.col("nation_avg"))
        .select(
            "c_custkey", "c_name", "c_acctbal", F.round("nation_avg", 6).alias("nation_avg")
        )
    )


@register(
    "window_value_functions",
    oracle="""
SELECT o_orderkey, o_orderpriority, o_totalprice,
       FIRST_VALUE(o_totalprice) OVER w AS cheapest_in_priority,
       LAST_VALUE(o_totalprice)  OVER w AS priciest_in_priority,
       NTH_VALUE(o_totalprice, 2) OVER w AS second_cheapest
FROM orders
WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
""",
)
def window_value_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window value functions — first_value / last_value / nth_value over
    an explicit unbounded frame (the default frame would truncate
    last_value at the current row; both engines get the full frame
    spelled out).  Deterministic via the o_orderkey tiebreak."""
    orders = load(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_orderpriority")
        .orderBy("o_totalprice", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return orders.select(
        "o_orderkey",
        "o_orderpriority",
        "o_totalprice",
        F.first("o_totalprice").over(w).alias("cheapest_in_priority"),
        F.last("o_totalprice").over(w).alias("priciest_in_priority"),
        F.nth_value("o_totalprice", 2).over(w).alias("second_cheapest"),
    )


@register(
    "window_percent_rank_cume",
    oracle="""
SELECT o_orderkey, o_orderpriority,
       ROUND(PERCENT_RANK() OVER w, 6) AS pct_rank,
       ROUND(CUME_DIST()    OVER w, 6) AS cume
FROM orders
WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey)
""",
)
def window_percent_rank_cume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Relative-position window functions: percent_rank and cume_dist of
    each order's price within its priority class.  The o_orderkey
    tiebreak makes both rank distributions deterministic; rounding to 6
    decimals absorbs the engines' division-order differences."""
    orders = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy("o_totalprice", "o_orderkey")
    return orders.select(
        "o_orderkey",
        "o_orderpriority",
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cume"),
    )


@register(
    "grouping_sets_priority_status",
    oracle="""
SELECT o_orderpriority, o_orderstatus,
       GROUPING(o_orderpriority) AS g_priority,
       GROUPING(o_orderstatus)   AS g_status,
       COUNT(*) AS n_orders
FROM orders
GROUP BY GROUPING SETS ((o_orderpriority), (o_orderstatus), ())
ORDER BY g_priority, g_status, o_orderpriority, o_orderstatus
""",
)
def grouping_sets_priority_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS (the general form under rollup/cube): the
    two single-column marginals plus the grand total in ONE pass —
    Spark expands each input row once per set, partial-aggregates
    map-side, and distinguishes "aggregated-away" from a genuine NULL
    key with grouping() flags (exactly the SQL-standard semantics the
    oracle states)."""
    orders = load(spark, sf_dir, "orders")
    return (
        orders.groupingSets(
            [["o_orderpriority"], ["o_orderstatus"], []],
            "o_orderpriority",
            "o_orderstatus",
        )
        .agg(
            F.grouping("o_orderpriority").cast("long").alias("g_priority"),
            F.grouping("o_orderstatus").cast("long").alias("g_status"),
            F.count(F.lit(1)).alias("n_orders"),
        )
        .orderBy("g_priority", "g_status", "o_orderpriority", "o_orderstatus")
    )


@register(
    "window_ntile_quartiles",
    oracle="""
WITH bucketed AS (
  SELECT o_orderpriority, o_totalprice,
         NTILE(4) OVER (PARTITION BY o_orderpriority
                        ORDER BY o_totalprice, o_orderkey) AS quartile
  FROM orders
)
SELECT o_orderpriority, quartile, COUNT(*) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*) AS avg_price
FROM bucketed
GROUP BY o_orderpriority, quartile
ORDER BY o_orderpriority, quartile
""",
)
def window_ntile_quartiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NTILE quartile profile per order priority (deterministic via the
    o_orderkey tiebreak in the window order)."""
    orders = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy("o_totalprice", "o_orderkey")
    return (
        orders.select(
            "o_orderpriority", "o_totalprice", F.ntile(4).over(w).alias("quartile")
        )
        .groupBy("o_orderpriority", "quartile")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            (F.sum(F.col("o_totalprice").cast(DEC)).cast("double") / F.count(F.lit(1))).alias(
                "avg_price"
            ),
        )
        .orderBy("o_orderpriority", "quartile")
    )


@register(
    "dense_rank_top_price_levels",
    oracle="""
WITH ranked AS (
  SELECT o_orderpriority, o_totalprice,
         DENSE_RANK() OVER (PARTITION BY o_orderpriority
                            ORDER BY o_totalprice DESC) AS lvl
  FROM orders
)
SELECT o_orderpriority, CAST(lvl AS INT) AS lvl, o_totalprice,
       COUNT(*) AS n_orders
FROM ranked WHERE lvl <= 3
GROUP BY o_orderpriority, lvl, o_totalprice
""",
)
def dense_rank_top_price_levels(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 distinct price LEVELS per priority with ties retained —
    DENSE_RANK semantics (row_number would drop tied orders; rank would
    skip levels), completing the ranking-function family next to
    row_number / percent_rank / cume_dist / ntile.

    Plan: one priority-keyed window; the level filter prunes before the
    rollup."""
    o = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy(F.col("o_totalprice").desc())
    return (
        o.select("o_orderpriority", "o_totalprice", F.dense_rank().over(w).alias("lvl"))
        .filter(F.col("lvl") <= 3)
        .groupBy("o_orderpriority", F.col("lvl").cast("int").alias("lvl"), "o_totalprice")
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )


@register(
    "variant_extract_agg",
    oracle=f"""
SELECT event_type,
       COUNT(*) AS n,
       CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT)
         AS sum_k,
       CAST(MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT)
         AS max_k
FROM events GROUP BY event_type
""",
)
def variant_extract_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured ingestion through Spark 4's VARIANT type:
    ``parse_json`` shreds the props JSON into the binary variant
    encoding once, ``variant_get`` extracts typed paths from it — the
    open-ended-schema path (unknown/evolving JSON) complementing
    ``from_json_struct``'s schema-full parse.  At 100 TB variant is the
    difference between re-parsing JSON text per access and one
    parse + O(1) binary path reads, and parquet writers can shred it
    columnar.

    Plan: map-side parse/extract inside codegen, one aggregate."""
    ev = load_spread(spark, sf_dir, "events")
    k = F.variant_get(F.parse_json("props"), "$.k", "bigint")
    return ev.select("event_type", k.alias("k")).groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("k").alias("sum_k"),
        F.max("k").alias("max_k"),
    )


@register(
    "null_safe_join_counts",
    oracle="""
WITH a AS (
  SELECT CASE WHEN event_id % 13 = 0 THEN NULL ELSE event_type END AS k,
         user_id % 16 AS bucket
  FROM events WHERE event_id % 2 = 0
),
b AS (
  SELECT CASE WHEN event_id % 13 = 0 THEN NULL ELSE event_type END AS k,
         user_id % 16 AS bucket, value
  FROM events WHERE event_id % 2 = 1
),
ag AS (SELECT k, bucket, COUNT(*) AS na FROM a GROUP BY k, bucket),
bg AS (SELECT k, bucket, COUNT(*) AS nb FROM b GROUP BY k, bucket)
SELECT ag.k AS event_type, ag.bucket,
       CAST(ag.na AS BIGINT) AS n_left, CAST(bg.nb AS BIGINT) AS n_right
FROM ag JOIN bg
  ON ag.k IS NOT DISTINCT FROM bg.k AND ag.bucket = bg.bucket
""",
)
def null_safe_join_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equi-join (``<=>`` / IS NOT DISTINCT FROM): the NULL
    partition matches ITSELF instead of vanishing — required whenever
    the join key is an optional attribute (here an event type nulled on
    a deterministic subset) and dropped-NULL semantics would silently
    lose the unattributed traffic.

    Spark plans ``<=>`` as an ordinary hash-join key (NULL hashes to a
    regular bucket), NOT a nested loop — which is the point: null-safe
    semantics cost nothing at scale.  Pre-aggregating both sides keeps
    the NULL key's join fan-out at counts×counts instead of rows×rows."""
    ev = load_spread(spark, sf_dir, "events")
    k = F.when(F.col("event_id") % 13 == 0, F.lit(None)).otherwise(
        F.col("event_type")
    )
    a = (
        ev.filter(F.col("event_id") % 2 == 0)
        .select(k.alias("k"), (F.col("user_id") % 16).alias("bucket"))
        .groupBy("k", "bucket")
        .agg(F.count(F.lit(1)).alias("n_left"))
    )
    b = (
        ev.filter(F.col("event_id") % 2 == 1)
        .select(k.alias("k"), (F.col("user_id") % 16).alias("bucket"))
        .groupBy("k", "bucket")
        .agg(F.count(F.lit(1)).alias("n_right"))
    )
    return a.alias("a").join(
        b.alias("b"),
        F.col("a.k").eqNullSafe(F.col("b.k"))
        & (F.col("a.bucket") == F.col("b.bucket")),
    ).select(
        F.col("a.k").alias("event_type"),
        F.col("a.bucket").alias("bucket"),
        "n_left",
        "n_right",
    )


@register(
    "try_arithmetic_safety",
    oracle="""
SELECT event_type,
       CAST(SUM(CASE WHEN value2 = 0 THEN NULL
                     ELSE CAST(ROUND(value / value2, 6) AS DECIMAL(18,6)) END)
            AS DOUBLE) AS sum_safe_ratio,
       CAST(SUM(CASE WHEN value2 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_zero_div,
       CAST(SUM(CASE WHEN try_cast(json_extract_string(props, '$.k') AS BIGINT)
                     IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_bad_cast
FROM (
  SELECT event_type, value, CAST(event_id % 7 AS DOUBLE) AS value2, props
  FROM events
) t
GROUP BY event_type
""",
)
def try_arithmetic_safety(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANSI-mode safety functions: under ``spark.sql.ansi.enabled``
    (Spark 4's default) a division by zero or an invalid cast FAILS the
    job — the correct default at 100 TB, where one corrupt row must not
    be silently nulled into a wrong aggregate.  Where null-on-error IS
    the intended semantics, the explicit ``try_divide`` / ``try_cast``
    forms declare it per-expression: this query audits a fabricated
    zero-divisor stream, summing the safe ratios (rounded into DECIMAL
    so the sum is order-independent) and counting the rows each guard
    absorbed.

    Plan: pure map-side projections + one aggregate."""
    ev = load_spread(spark, sf_dir, "events")
    v2 = (F.col("event_id") % 7).cast("double")
    safe_ratio = F.round(F.try_divide(F.col("value"), v2), 6)
    bad_cast = F.get_json_object("props", "$.k").try_cast("bigint")
    return ev.groupBy("event_type").agg(
        F.sum(safe_ratio.cast("decimal(18,6)")).cast("double").alias(
            "sum_safe_ratio"
        ),
        F.sum(F.when(v2 == 0, 1).otherwise(0)).alias("n_zero_div"),
        F.sum(F.when(bad_cast.isNull(), 1).otherwise(0)).alias("n_bad_cast"),
    )


BUCKETED_N = 8


@register(
    "bucketed_join_no_shuffle",
    oracle=f"""
SELECT o.o_orderkey,
       CAST(COUNT(*) AS BIGINT) AS n_lines,
       ROUND(CAST(SUM(CAST(l.l_quantity AS DECIMAL(18,6))) AS DOUBLE), 6)
         AS total_qty
FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE o.o_orderkey % 50 = 0
GROUP BY o.o_orderkey
""",
)
def bucketed_join_no_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Co-located join via BUCKETED storage: both sides are written
    ``bucketBy({BUCKETED_N}, orderkey).sortBy(orderkey)``, so the
    sort-merge join reads pre-partitioned, pre-sorted buckets with ZERO
    exchange inside the join — the storage-layout answer to the repeated
    fact⋈fact shuffle, which at 100 TB is the single largest recurring
    cost a warehouse can delete (`tests/test_bucketing.py` asserts the
    no-Exchange plan; this registered query proves the bucketed tables
    produce the same ANSWERS as the plain parquet join the oracle runs).

    The bucket count is a layout contract: readers co-locate only while
    both tables agree on ({BUCKETED_N}, key) — the same
    union-compatibility discipline as the HLL sketch lgK."""
    orders = load(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    li = load_spread(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    sfx = os.path.basename(sf_dir.rstrip("/")).replace(".", "_")
    t_o, t_l = f"bktq_orders_{sfx}", f"bktq_lineitem_{sfx}"
    # Cross-session idempotency: an in-memory catalog forgets tables between
    # sessions but their warehouse directories persist; clear both before
    # re-creating or CREATE fails with LOCATION_ALREADY_EXISTS.
    import shutil
    from urllib.parse import urlparse

    spark.sql(f"DROP TABLE IF EXISTS {t_o}")
    spark.sql(f"DROP TABLE IF EXISTS {t_l}")
    wh = urlparse(spark.conf.get("spark.sql.warehouse.dir")).path
    for t in (t_o, t_l):
        shutil.rmtree(os.path.join(wh, t), ignore_errors=True)
    (
        orders.write.mode("overwrite")
        .bucketBy(BUCKETED_N, "o_orderkey")
        .sortBy("o_orderkey")
        .saveAsTable(t_o)
    )
    (
        li.write.mode("overwrite")
        .bucketBy(BUCKETED_N, "l_orderkey")
        .sortBy("l_orderkey")
        .saveAsTable(t_l)
    )
    joined = (
        spark.table(t_o)
        .filter(F.col("o_orderkey") % 50 == 0)
        .join(spark.table(t_l), F.col("l_orderkey") == F.col("o_orderkey"))
    )
    return joined.groupBy("o_orderkey").agg(
        F.count(F.lit(1)).alias("n_lines"),
        F.round(F.sum(F.col("l_quantity").cast("decimal(18,6)")).cast("double"), 6).alias(
            "total_qty"
        ),
    )
