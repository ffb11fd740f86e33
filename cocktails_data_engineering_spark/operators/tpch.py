"""TPC-H-shaped analytics beyond Q1/Q3/Q5: the classic decision-support
join/subquery patterns, adapted to the driver fixture's column subset.

The reference project is a crawler with no analytical layer (its README,
``/root/reference/README.md:2``, defers analytics to a future web app);
these queries supply the decision-support surface a user of the collected
tables would run, and exercise the planner shapes the relational module
doesn't already cover: EXISTS/NOT-EXISTS rewritten as semi/anti joins with
non-equi predicates, conditional-aggregate ratios, group-HAVING semi
joins back to the fact, and disjunctive multi-column pushdown predicates.

Adaptations (fixture lacks some TPC-H columns): Q4's lateness test uses
``l_shipdate > o_orderdate`` (no commit/receipt dates); Q14's promo class
is ``p_type = 'PROMO'`` (types are single words here); Q19 drops the
container/shipmode terms; Q22 replaces "no orders at all" (empty at this
scale — every customer has orders) with "no URGENT-priority orders".

Scale rules shared by all of these: filters sit directly on the scans so
they reach the parquet reader; dimensions broadcast; double aggregation
goes through DECIMAL(18,6) (``functions/numerics.py``) so results are
partitioning-order-independent on a 1000-executor cluster.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.numerics import DEC, dsum, oracle_dsum
from ..registry import register
from ..sources.tables import load, load_dim


# ---------------------------------------------------------------------------
# Q4 shape: EXISTS -> left-semi join with a non-equi residual predicate
# ---------------------------------------------------------------------------
@register(
    "q4_priority_late_ship",
    oracle="""
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1996-07-01'
  AND EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
GROUP BY o_orderpriority
ORDER BY o_orderpriority
""",
)
def q4_priority_late_ship(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: orders (one half-year window) having at least one
    line item shipped after the order date, counted per priority.

    Plan notes: the EXISTS is a LEFT SEMI join on the equi key
    ``l_orderkey = o_orderkey`` with the lateness comparison as a residual
    predicate — one shuffle on orderkey, no duplication of matching
    orders, and the date filter on orders pushes into its scan.  The
    lineitem side projects only (l_orderkey, l_shipdate).
    """
    orders = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-07-01").cast("timestamp"))
    )
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    return (
        orders.join(
            li,
            (F.col("l_orderkey") == F.col("o_orderkey"))
            & (F.col("l_shipdate") > F.col("o_orderdate")),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


# ---------------------------------------------------------------------------
# Q10 shape: returned-item revenue, top-k customers
# ---------------------------------------------------------------------------
@register(
    "q10_returned_item_revenue",
    oracle=f"""
SELECT c_custkey, c_name, n_name,
       {oracle_dsum('l_extendedprice * (1 - l_discount)')} AS revenue,
       c_acctbal
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN nation   ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
  AND o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01'
GROUP BY c_custkey, c_name, n_name, c_acctbal
ORDER BY revenue DESC, c_custkey
LIMIT 20
""",
)
def q10_returned_item_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: the 20 customers losing the most revenue to
    returned items in one year.

    Plan notes: returnflag + orderdate filters push into the scans before
    any join; nation broadcasts; TakeOrderedAndProject caps the final sort
    at k=20 per partition, so no global sort materializes.
    """
    cust = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    nation = load_dim(spark, sf_dir, "nation")
    return (
        cust.join(orders, F.col("c_custkey") == F.col("o_custkey"))
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(nation, F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "n_name", "c_acctbal")
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"))
        .select("c_custkey", "c_name", "n_name", "revenue", "c_acctbal")
        .orderBy(F.col("revenue").desc(), "c_custkey")
        .limit(20)
    )


# ---------------------------------------------------------------------------
# Q14 shape: conditional-aggregate ratio (promo revenue share)
# ---------------------------------------------------------------------------
@register(
    "q14_promo_revenue_share",
    oracle=f"""
SELECT 100.0 * {oracle_dsum("CASE WHEN p_type = 'PROMO' "
                            "THEN l_extendedprice * (1 - l_discount) ELSE 0 END")}
             / {oracle_dsum('l_extendedprice * (1 - l_discount)')} AS promo_share_pct
FROM lineitem
JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1996-03-01' AND l_shipdate < TIMESTAMP '1996-06-01'
""",
)
def q14_promo_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: percentage of one quarter's revenue from PROMO
    parts — a conditional aggregate computed in a single pass.

    Plan notes: part is tiny and broadcasts, so the only wide operation is
    the final 1-group aggregate (partial map-side, single exchange of one
    row per task).  Both sums accumulate in DECIMAL; the ratio divides the
    same two doubles in both engines, so the result is bit-identical.
    """
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-03-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-06-01").cast("timestamp"))
    )
    part = F.broadcast(load(spark, sf_dir, "part").select("p_partkey", "p_type"))
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(part, F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            (
                F.lit(100.0)
                * dsum(F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0)))
                / dsum(rev)
            ).alias("promo_share_pct")
        )
    )


# ---------------------------------------------------------------------------
# Q18 shape: group-HAVING on the fact, semi join back to the order header
# ---------------------------------------------------------------------------
@register(
    "q18_large_volume_orders",
    oracle=f"""
WITH big AS (
  SELECT l_orderkey, {oracle_dsum('l_quantity')} AS sum_qty
  FROM lineitem GROUP BY l_orderkey
  HAVING SUM(CAST(l_quantity AS DECIMAL(18,6))) > 300
)
SELECT c_name, c_custkey, o_orderkey,
       strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
       o_totalprice, sum_qty
FROM big
JOIN orders   ON o_orderkey = l_orderkey
JOIN customer ON c_custkey = o_custkey
ORDER BY o_totalprice DESC, o_orderkey
""",
)
def q18_large_volume_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: orders whose total quantity exceeds 300 units,
    with their customer.

    Plan notes: the HAVING aggregate runs on lineitem projected to two
    columns (partial agg map-side, one shuffle on orderkey); the
    survivors are a tiny set, so both subsequent joins broadcast the
    aggregated side against orders/customer — the fact table is touched
    exactly once.
    """
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    big = (
        li.groupBy("l_orderkey")
        .agg(dsum(F.col("l_quantity")).alias("sum_qty"))
        .filter(F.col("sum_qty") > 300)
    )
    orders = load(spark, sf_dir, "orders")
    cust = load(spark, sf_dir, "customer")
    return (
        F.broadcast(big)
        .join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(cust, F.col("c_custkey") == F.col("o_custkey"))
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            "o_totalprice",
            "sum_qty",
        )
        .orderBy(F.col("o_totalprice").desc(), "o_orderkey")
    )


# ---------------------------------------------------------------------------
# Q19 shape: disjunctive multi-column predicate over a broadcast join
# ---------------------------------------------------------------------------
@register(
    "q19_disjunctive_revenue",
    oracle=f"""
SELECT {oracle_dsum('l_extendedprice * (1 - l_discount)')} AS revenue
FROM lineitem
JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1  AND 20)
   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 25 AND l_quantity BETWEEN 10 AND 30)
   OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 35 AND l_quantity BETWEEN 20 AND 40)
""",
)
def q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: revenue under three OR'd brand/size/quantity
    predicate groups — the classic disjunctive-pushdown test.

    Plan notes: Catalyst extracts the common sub-disjunctions it can —
    ``l_quantity BETWEEN 1 AND 40`` pushes into the lineitem scan and
    ``p_size BETWEEN 1 AND 35`` into the part scan — before the broadcast
    join evaluates the full disjunction as the join residual.
    """
    li = load(spark, sf_dir, "lineitem")
    part = F.broadcast(load(spark, sf_dir, "part"))
    q, b, s = F.col("l_quantity"), F.col("p_brand"), F.col("p_size")
    cond = (
        ((b == "Brand#12") & s.between(1, 15) & q.between(1, 20))
        | ((b == "Brand#23") & s.between(1, 25) & q.between(10, 30))
        | ((b == "Brand#34") & s.between(1, 35) & q.between(20, 40))
    )
    return (
        li.join(part, F.col("l_partkey") == F.col("p_partkey"))
        .filter(cond)
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"))
    )


# ---------------------------------------------------------------------------
# Q22 shape: scalar subquery + NOT EXISTS -> broadcast scalar + anti join
# ---------------------------------------------------------------------------
@register(
    "q22_wealthy_inactive",
    oracle="""
WITH threshold AS (
  SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*) AS avg_bal
  FROM customer WHERE c_acctbal > 0
)
SELECT c_nationkey, COUNT(*) AS numcust,
       CAST(SUM(CAST(c_acctbal AS DECIMAL(18,6))) AS DOUBLE) AS totacctbal
FROM customer, threshold
WHERE c_acctbal > avg_bal
  AND NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
GROUP BY c_nationkey
ORDER BY c_nationkey
""",
)
def q22_wealthy_inactive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: above-average-balance customers with no urgent
    orders, grouped by nation.

    Plan notes: the scalar average is a one-row aggregate broadcast as a
    literal-like cross join (no shuffle of customer); the NOT EXISTS is a
    LEFT ANTI join against orders pre-filtered to URGENT (that filter
    pushes into the orders scan, shrinking the anti-join build side ~5×).
    DECIMAL accumulation keeps the threshold comparison engine-stable.
    """
    cust = load(spark, sf_dir, "customer")
    threshold = (
        cust.filter(F.col("c_acctbal") > 0)
        .agg(
            (F.sum(F.col("c_acctbal").cast(DEC)).cast("double") / F.count(F.lit(1))).alias(
                "avg_bal"
            )
        )
    )
    urgent = load(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    ).select("o_custkey")
    return (
        cust.crossJoin(F.broadcast(threshold))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(urgent, F.col("o_custkey") == F.col("c_custkey"), "left_anti")
        .groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.sum(F.col("c_acctbal").cast(DEC)).cast("double").alias("totacctbal"),
        )
        .orderBy("c_nationkey")
    )


# ---------------------------------------------------------------------------
# Q2-flavored argmin-per-group: join back to the per-group minimum
# ---------------------------------------------------------------------------
@register(
    "cheapest_supplier_per_part",
    oracle="""
WITH priced AS (
  SELECT l_partkey, l_suppkey,
         MIN(l_extendedprice / l_quantity) AS unit_price
  FROM lineitem GROUP BY l_partkey, l_suppkey
),
ranked AS (
  SELECT l_partkey, l_suppkey, ROUND(unit_price, 6) AS unit_price,
         ROW_NUMBER() OVER (PARTITION BY l_partkey
                            ORDER BY unit_price, l_suppkey) AS rk
  FROM priced
)
SELECT r.l_partkey, s.s_name, r.unit_price
FROM ranked r JOIN supplier s ON s.s_suppkey = r.l_suppkey
WHERE rk = 1
""",
)
def cheapest_supplier_per_part(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2's essential shape (argmin per group): the supplier with
    the lowest observed unit price for every part.

    Plan: per-(part, supplier) MIN aggregate (one shuffle, map-side
    partials), then a row_number window on the aggregated (small) frame
    — never a self-join of the fact against a per-group MIN subquery,
    which would scan twice.  Supplier resolves via broadcast.  Unit
    price is a double division identical in both engines; rounding only
    at output (the rank orders on the raw double on both sides).
    """
    li = load(spark, sf_dir, "lineitem")
    supp = F.broadcast(load(spark, sf_dir, "supplier").select("s_suppkey", "s_name"))
    priced = (
        li.groupBy("l_partkey", "l_suppkey")
        .agg(F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("unit_price"))
    )
    from pyspark.sql import Window

    w = Window.partitionBy("l_partkey").orderBy("unit_price", "l_suppkey")
    return (
        priced.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .join(supp, F.col("s_suppkey") == F.col("l_suppkey"))
        .select("l_partkey", "s_name", F.round("unit_price", 6).alias("unit_price"))
    )


# ---------------------------------------------------------------------------
# Left-outer aggregate: keep empty groups
# ---------------------------------------------------------------------------
@register(
    "customer_order_counts_left",
    oracle="""
SELECT c_custkey, c_mktsegment,
       COUNT(o_orderkey) AS n_orders,
       COALESCE(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE), 0.0)
         AS total_spend
FROM customer
LEFT JOIN orders ON o_custkey = c_custkey AND o_orderpriority = '1-URGENT'
GROUP BY c_custkey, c_mktsegment
""",
)
def customer_order_counts_left(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-outer aggregate: urgent-order count and spend per customer,
    KEEPING customers with none (count 0, spend 0.0) — the outer-join
    null-handling contract (COUNT skips nulls, SUM of no rows coalesces
    to zero) stated identically in both engines.  The priority filter
    lives in the JOIN CONDITION, not a WHERE (a WHERE would silently
    turn the left join inner — the classic outer-join bug, tested here
    against the oracle)."""
    cust = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders")
    return (
        cust.join(
            orders,
            (F.col("o_custkey") == F.col("c_custkey"))
            & (F.col("o_orderpriority") == "1-URGENT"),
            "left",
        )
        .groupBy("c_custkey", "c_mktsegment")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            F.coalesce(
                F.sum(F.col("o_totalprice").cast(DEC)).cast("double"), F.lit(0.0)
            ).alias("total_spend"),
        )
    )


# ---------------------------------------------------------------------------
# Date arithmetic: shipping latency
# ---------------------------------------------------------------------------
@register(
    "order_ship_latency",
    oracle="""
SELECT o_orderpriority,
       COUNT(*) AS n_lines,
       CAST(SUM(CAST(date_diff('day', o_orderdate, l_shipdate) AS DECIMAL(18,6)))
            AS DOUBLE) / COUNT(*) AS avg_latency_days,
       MAX(date_diff('day', o_orderdate, l_shipdate)) AS max_latency_days
FROM orders JOIN lineitem ON l_orderkey = o_orderkey
GROUP BY o_orderpriority
ORDER BY o_orderpriority
""",
)
def order_ship_latency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date arithmetic over the order→ship timeline: average and maximum
    days from order to line-item shipment per priority.  ``datediff`` on
    day-truncated timestamps matches DuckDB's ``date_diff('day', ...)``
    exactly (both fixture columns are midnight-aligned); the mean goes
    through DECIMAL so group order can't shift the double."""
    orders = load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority", "o_orderdate"
    )
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    lat = F.datediff(F.col("l_shipdate"), F.col("o_orderdate"))
    return (
        orders.join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .select("o_orderpriority", lat.alias("lat"))
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            (F.sum(F.col("lat").cast(DEC)).cast("double") / F.count(F.lit(1))).alias(
                "avg_latency_days"
            ),
            F.max("lat").alias("max_latency_days"),
        )
        .orderBy("o_orderpriority")
    )
