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


# ===========================================================================
# Round-3 widening: the remaining TPC-H shapes (Q6-Q9, Q11-Q13, Q15-Q17,
# Q20, Q21), adapted to the fixture's column subset.  Adaptations (the
# fixture has no partsupp, commit/receipt dates, shipmode, or comments):
# Q9's supply cost proxies as 0.6 * p_retailprice; Q11's "stock value"
# becomes lineitem revenue share; Q12 groups by l_linestatus instead of
# shipmode and defines late as ship > order + 60 days; Q21 likewise.
# Each docstring notes its own deviation.
# ===========================================================================


@register(
    "q6_forecast_revenue",
    oracle=f"""
SELECT {oracle_dsum('l_extendedprice * l_discount')} AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
  AND l_discount BETWEEN CAST(0.02 AS DOUBLE) AND CAST(0.04 AS DOUBLE)
  AND l_quantity < 24
""",
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6: revenue change from dropping a discount band — a pure
    scan-side query, the canonical predicate-pushdown test.

    Plan notes: all three predicates (shipdate range, discount band,
    quantity) push into the parquet scan as PushedFilters; no join, one
    single-row aggregate with map-side partials.  The discount bounds are
    explicit DOUBLE literals in the oracle so DuckDB doesn't promote the
    comparison to DECIMAL (which would differ from Spark's double
    comparison at the band edges)."""
    li = load(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & F.col("l_discount").between(0.02, 0.04)
            & (F.col("l_quantity") < 24)
        )
        .agg(dsum(F.col("l_extendedprice") * F.col("l_discount")).alias("revenue"))
    )


@register(
    "q7_volume_shipping",
    oracle=f"""
SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       CAST(year(l_shipdate) AS INT) AS l_year,
       {oracle_dsum('l_extendedprice * (1 - l_discount)')} AS revenue
FROM lineitem
JOIN supplier ON s_suppkey = l_suppkey
JOIN orders   ON o_orderkey = l_orderkey
JOIN customer ON c_custkey = o_custkey
JOIN nation n1 ON n1.n_nationkey = s_nationkey
JOIN nation n2 ON n2.n_nationkey = c_nationkey
WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
  AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
    OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
GROUP BY n1.n_name, n2.n_name, CAST(year(l_shipdate) AS INT)
ORDER BY supp_nation, cust_nation, l_year
""",
)
def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7: shipping volume between two nations, per direction and
    year.

    Plan notes: both nation dims broadcast; the nation-pair disjunction
    becomes a residual after the broadcasts, and because each branch pins
    BOTH nations, Catalyst derives IN ('NATION_1','NATION_2') filters
    that cut supplier and customer before the fact joins.  The only wide
    shuffles are the two fact equi-joins on orderkey/custkey."""
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    supp = load(spark, sf_dir, "supplier")
    orders = load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    cust = load(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n1 = F.broadcast(load(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("s_nkey"), F.col("n_name").alias("supp_nation")))
    n2 = F.broadcast(load(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("c_nkey"), F.col("n_name").alias("cust_nation")))
    pair = (
        ((F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2"))
        | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    )
    return (
        li.join(F.broadcast(supp), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(cust, F.col("c_custkey") == F.col("o_custkey"))
        .join(n1, F.col("s_nkey") == F.col("s_nationkey"))
        .join(n2, F.col("c_nkey") == F.col("c_nationkey"))
        .filter(pair)
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").cast("int").alias("l_year"))
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


@register(
    "q8_market_share",
    oracle=f"""
WITH base AS (
  SELECT CAST(year(o_orderdate) AS INT) AS o_year,
         l_extendedprice * (1 - l_discount) AS volume,
         n1.n_name AS supp_nation
  FROM lineitem
  JOIN part     ON p_partkey = l_partkey
  JOIN supplier ON s_suppkey = l_suppkey
  JOIN orders   ON o_orderkey = l_orderkey
  JOIN customer ON c_custkey = o_custkey
  JOIN nation n1 ON n1.n_nationkey = s_nationkey
  JOIN nation n2 ON n2.n_nationkey = c_nationkey
  JOIN region   ON r_regionkey = n2.n_regionkey
  WHERE r_name = 'ASIA' AND p_type = 'ECONOMY'
    AND o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1998-01-01'
)
SELECT o_year,
       {oracle_dsum("CASE WHEN supp_nation = 'NATION_2' THEN volume ELSE 0 END")}
         / {oracle_dsum('volume')} AS mkt_share
FROM base GROUP BY o_year ORDER BY o_year
""",
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8: one nation's share of ECONOMY-part revenue sold into the
    ASIA region's market, per year.

    Plan notes: part/supplier/nation/region all broadcast; the share is a
    conditional-sum ratio over ONE aggregated pass (no second scan to
    compute the denominator); both sums accumulate in DECIMAL and the
    final division happens on identical doubles in both engines."""
    li = load(spark, sf_dir, "lineitem")
    part = F.broadcast(
        load(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY").select("p_partkey")
    )
    supp = F.broadcast(load(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey"))
    orders = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    ).select("o_orderkey", "o_custkey", "o_orderdate")
    cust = load(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n1 = F.broadcast(load(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("s_nkey"), F.col("n_name").alias("supp_nation")))
    n2 = F.broadcast(load(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("c_nkey"), F.col("n_regionkey").alias("c_rkey")))
    region = F.broadcast(
        load(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA").select("r_regionkey")
    )
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    base = (
        li.join(part, F.col("p_partkey") == F.col("l_partkey"))
        .join(supp, F.col("s_suppkey") == F.col("l_suppkey"))
        .join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(cust, F.col("c_custkey") == F.col("o_custkey"))
        .join(n1, F.col("s_nkey") == F.col("s_nationkey"))
        .join(n2, F.col("c_nkey") == F.col("c_nationkey"))
        .join(region, F.col("r_regionkey") == F.col("c_rkey"))
        .select(
            F.year("o_orderdate").cast("int").alias("o_year"),
            vol.alias("volume"),
            "supp_nation",
        )
    )
    return (
        base.groupBy("o_year")
        .agg(
            (
                dsum(F.when(F.col("supp_nation") == "NATION_2", F.col("volume")).otherwise(F.lit(0)))
                / dsum(F.col("volume"))
            ).alias("mkt_share")
        )
        .orderBy("o_year")
    )


@register(
    "q9_product_profit",
    oracle=f"""
SELECT n_name AS nation, CAST(year(o_orderdate) AS INT) AS o_year,
       {oracle_dsum('l_extendedprice * (1 - l_discount) - 0.6 * p_retailprice * l_quantity')}
         AS sum_profit
FROM lineitem
JOIN part     ON p_partkey = l_partkey
JOIN supplier ON s_suppkey = l_suppkey
JOIN orders   ON o_orderkey = l_orderkey
JOIN nation   ON n_nationkey = s_nationkey
WHERE p_name LIKE '%widget%'
GROUP BY n_name, CAST(year(o_orderdate) AS INT)
ORDER BY nation, o_year DESC
""",
)
def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape: profit on one product line per supplier nation and
    year.  Adaptation: the fixture has no partsupp, so supply cost
    proxies as ``0.6 * p_retailprice`` (deterministic, both engines).

    Plan notes: the p_name LIKE filter prunes part BEFORE the broadcast,
    shrinking the build side; profit is computed per row then
    DECIMAL-summed (one shuffle on the group keys only)."""
    li = load(spark, sf_dir, "lineitem")
    part = F.broadcast(
        load(spark, sf_dir, "part")
        .filter(F.col("p_name").like("%widget%"))
        .select("p_partkey", "p_retailprice")
    )
    supp = F.broadcast(load(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey"))
    orders = load(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    nation = F.broadcast(load(spark, sf_dir, "nation").select("n_nationkey", "n_name"))
    profit = (
        F.col("l_extendedprice") * (1 - F.col("l_discount"))
        - 0.6 * F.col("p_retailprice") * F.col("l_quantity")
    )
    return (
        li.join(part, F.col("p_partkey") == F.col("l_partkey"))
        .join(supp, F.col("s_suppkey") == F.col("l_suppkey"))
        .join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(nation, F.col("n_nationkey") == F.col("s_nationkey"))
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("int").alias("o_year"),
        )
        .agg(dsum(profit).alias("sum_profit"))
        .orderBy("nation", F.col("o_year").desc())
    )


@register(
    "q11_important_stock",
    oracle=f"""
WITH value_by_part AS (
  SELECT l_partkey, {oracle_dsum('l_extendedprice * (1 - l_discount)')} AS part_value
  FROM lineitem GROUP BY l_partkey
),
total AS (SELECT {oracle_dsum('l_extendedprice * (1 - l_discount)')} AS total_value FROM lineitem)
SELECT l_partkey, part_value
FROM value_by_part, total
WHERE part_value > total_value * CAST(0.0006 AS DOUBLE)
ORDER BY part_value DESC, l_partkey
""",
)
def q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: parts whose share of total value exceeds a
    threshold fraction.  Adaptation: no partsupp table, so "stock value"
    is lineitem revenue per part and the fraction is 0.06%.

    Plan notes: the global total is a one-row aggregate broadcast into
    the HAVING comparison (no second scan of the per-part aggregate);
    both aggregations share the same scan via Spark's exchange reuse
    when AQE materializes it."""
    li = load(spark, sf_dir, "lineitem")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    by_part = li.groupBy("l_partkey").agg(dsum(rev).alias("part_value"))
    total = li.agg(dsum(rev).alias("total_value"))
    return (
        by_part.crossJoin(F.broadcast(total))
        .filter(F.col("part_value") > F.col("total_value") * 0.0006)
        .select("l_partkey", "part_value")
        .orderBy(F.col("part_value").desc(), "l_partkey")
    )


@register(
    "q12_late_lines_by_status",
    oracle="""
SELECT l_linestatus,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END)
            AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END)
            AS BIGINT) AS low_line_count
FROM orders JOIN lineitem ON l_orderkey = o_orderkey
WHERE date_diff('day', o_orderdate, l_shipdate) > 60
  AND l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
GROUP BY l_linestatus
ORDER BY l_linestatus
""",
)
def q12_late_lines_by_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: high- vs low-priority counts of late lines per
    class.  Adaptation: no shipmode/commit/receipt columns — groups by
    l_linestatus and defines late as shipped > 60 days after ordering.

    Plan notes: the shipdate range pushes into the lineitem scan; the
    lateness predicate is the join residual; priorities split via two
    conditional counts in ONE aggregate pass."""
    orders = load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    ).select("l_orderkey", "l_shipdate", "l_linestatus")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        orders.join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .filter(F.datediff(F.col("l_shipdate"), F.col("o_orderdate")) > 60)
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
        .orderBy("l_linestatus")
    )


@register(
    "q13_customer_distribution",
    oracle="""
WITH per_cust AS (
  SELECT c_custkey, COUNT(o_orderkey) AS c_count
  FROM customer
  LEFT JOIN orders ON o_custkey = c_custkey AND o_orderstatus <> 'F'
  GROUP BY c_custkey
)
SELECT c_count, COUNT(*) AS custdist
FROM per_cust
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
""",
)
def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13: the distribution of customers by order count — a
    two-level aggregate over a filtered LEFT JOIN (customers with zero
    qualifying orders land in the c_count=0 bucket, which an inner join
    would silently drop).  Adaptation: the comment NOT LIKE filter
    becomes ``o_orderstatus <> 'F'`` (fixture has no comments).

    Plan notes: the status filter lives in the JOIN CONDITION to keep
    the join outer; level-1 shuffles on custkey, level-2 on the tiny
    c_count domain."""
    cust = load(spark, sf_dir, "customer").select("c_custkey")
    orders = load(spark, sf_dir, "orders").select("o_custkey", "o_orderkey", "o_orderstatus")
    per_cust = (
        cust.join(
            orders,
            (F.col("o_custkey") == F.col("c_custkey")) & (F.col("o_orderstatus") != "F"),
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


@register(
    "q15_top_supplier",
    oracle=f"""
WITH revenue AS (
  SELECT l_suppkey AS supplier_no,
         {oracle_dsum('l_extendedprice * (1 - l_discount)')} AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1996-04-01'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, total_revenue
FROM supplier JOIN revenue ON s_suppkey = supplier_no
WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
ORDER BY s_suppkey
""",
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15: the supplier(s) with the maximum revenue over one
    quarter — the view + scalar-max shape.

    Plan notes: the quarterly aggregate is computed ONCE and localCheckpoint
    is unnecessary — Spark reuses the exchange for the max branch; the
    scalar max broadcasts into the equality filter.  Revenue equality is
    exact because both sides compare the same DECIMAL-summed doubles."""
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    revenue = (
        li.groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("total_revenue"))
    )
    max_rev = revenue.agg(F.max("total_revenue").alias("max_revenue"))
    supp = F.broadcast(load(spark, sf_dir, "supplier").select("s_suppkey", "s_name"))
    return (
        revenue.crossJoin(F.broadcast(max_rev))
        .filter(F.col("total_revenue") == F.col("max_revenue"))
        .join(supp, F.col("s_suppkey") == F.col("supplier_no"))
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


@register(
    "q16_supplier_part_counts",
    oracle="""
SELECT p_brand, p_type, p_size,
       COUNT(DISTINCT l_suppkey) AS supplier_cnt
FROM part JOIN lineitem ON l_partkey = p_partkey
WHERE p_brand <> 'Brand#1' AND p_type <> 'PROMO'
  AND p_size IN (1, 4, 9, 14, 19, 24, 29, 34)
GROUP BY p_brand, p_type, p_size
ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
""",
)
def q16_supplier_part_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: how many distinct suppliers serve each surviving
    (brand, type, size) combination.  Adaptation: supplier-part pairs
    come from lineitem (no partsupp), and the complaint-supplier
    exclusion is dropped (no comments).

    Plan notes: the three part predicates prune the broadcast build side
    BEFORE the join; COUNT(DISTINCT) expands to a two-phase aggregate
    (dedup on the group+suppkey, then count) — both shuffles on the
    small post-filter key space."""
    part = F.broadcast(
        load(spark, sf_dir, "part")
        .filter(
            (F.col("p_brand") != "Brand#1")
            & (F.col("p_type") != "PROMO")
            & F.col("p_size").isin(1, 4, 9, 14, 19, 24, 29, 34)
        )
        .select("p_partkey", "p_brand", "p_type", "p_size")
    )
    li = load(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    return (
        part.join(li, F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.col("supplier_cnt").desc(), "p_brand", "p_type", "p_size")
    )


@register(
    "q17_small_quantity_revenue",
    oracle=f"""
WITH avg_qty AS (
  SELECT l_partkey AS a_partkey,
         CAST(0.2 AS DOUBLE) * ({oracle_dsum('l_quantity')} / COUNT(*)) AS qty_threshold
  FROM lineitem GROUP BY l_partkey
)
SELECT {oracle_dsum('l_extendedprice')} / CAST(7.0 AS DOUBLE) AS avg_yearly
FROM lineitem
JOIN part ON p_partkey = l_partkey
JOIN avg_qty ON a_partkey = l_partkey
WHERE p_brand = 'Brand#12' AND l_quantity < qty_threshold
""",
)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17: average yearly revenue lost if small-quantity orders
    (below 20% of the part's mean order size) were not taken.

    Plan notes: the correlated scalar subquery becomes a per-part
    aggregate joined back — the fact is scanned twice but the aggregate
    side shrinks to one row per part; the brand filter broadcasts part
    pruned first.  The mean goes through DECIMAL so the 0.2× threshold
    is the same double in both engines."""
    li = load(spark, sf_dir, "lineitem")
    part = F.broadcast(
        load(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#12").select("p_partkey")
    )
    avg_qty = (
        li.groupBy(F.col("l_partkey").alias("a_partkey"))
        .agg((F.lit(0.2) * (dsum(F.col("l_quantity")) / F.count(F.lit(1)))).alias("qty_threshold"))
    )
    return (
        li.join(part, F.col("p_partkey") == F.col("l_partkey"))
        .join(avg_qty, F.col("a_partkey") == F.col("l_partkey"))
        .filter(F.col("l_quantity") < F.col("qty_threshold"))
        .agg((dsum(F.col("l_extendedprice")) / F.lit(7.0)).alias("avg_yearly"))
    )


@register(
    "q20_promotion_suppliers",
    oracle=f"""
WITH qualifying AS (
  SELECT l_suppkey
  FROM lineitem JOIN part ON p_partkey = l_partkey
  WHERE p_name LIKE 'red%'
    AND l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
  GROUP BY l_suppkey
  HAVING SUM(CAST(l_quantity AS DECIMAL(18,6))) > 50
)
SELECT s_suppkey, s_name
FROM supplier
WHERE s_suppkey IN (SELECT l_suppkey FROM qualifying)
ORDER BY s_suppkey
""",
)
def q20_promotion_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: suppliers who moved real volume (>50 units in the
    year) of the promoted 'red%' part line.  Adaptation: availability
    (partsupp.availqty) is absent, so the volume test stands alone.

    Plan notes: part prunes on the LIKE prefix before broadcasting; the
    HAVING aggregate shrinks lineitem to qualifying suppkeys, which then
    SEMI-join supplier — supplier rows are never duplicated."""
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    part = F.broadcast(
        load(spark, sf_dir, "part").filter(F.col("p_name").like("red%")).select("p_partkey")
    )
    qualifying = (
        li.join(part, F.col("p_partkey") == F.col("l_partkey"))
        .groupBy("l_suppkey")
        .agg(F.sum(F.col("l_quantity").cast(DEC)).alias("sum_qty"))
        .filter(F.col("sum_qty") > 50)
        .select("l_suppkey")
    )
    supp = load(spark, sf_dir, "supplier")
    return (
        supp.join(qualifying, F.col("l_suppkey") == F.col("s_suppkey"), "left_semi")
        .select("s_suppkey", "s_name")
        .orderBy("s_suppkey")
    )


@register(
    "q21_waiting_suppliers",
    oracle="""
WITH late AS (
  SELECT l_orderkey, l_suppkey
  FROM lineitem JOIN orders ON o_orderkey = l_orderkey
  WHERE o_orderstatus = 'F' AND date_diff('day', o_orderdate, l_shipdate) > 60
),
all_lines AS (SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem)
SELECT s_name, COUNT(*) AS numwait
FROM (SELECT DISTINCT l1.l_orderkey, l1.l_suppkey FROM late l1) l1
JOIN supplier ON s_suppkey = l1.l_suppkey
WHERE EXISTS (SELECT 1 FROM all_lines l2
              WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM late l3
                  WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey)
GROUP BY s_name
ORDER BY numwait DESC, s_name
""",
)
def q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape: suppliers who were the SOLE late supplier on a
    finished multi-supplier order.  Adaptation: late = shipped > 60 days
    after ordering (no commit/receipt dates).

    Plan notes: the EXISTS becomes a LEFT SEMI and the NOT EXISTS a LEFT
    ANTI join, both on orderkey with the supplier-inequality as residual
    — the two classic decorrelations, stacked.  The late set is computed
    once and reused for the probe and the anti side (checkpointed so the
    join+filter pipeline doesn't run twice)."""
    orders = load(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F").select(
        "o_orderkey", "o_orderdate"
    )
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey", "l_shipdate")
    from ..checkpointing import materialize

    late = (
        li.join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .filter(F.datediff(F.col("l_shipdate"), F.col("o_orderdate")) > 60)
        .select("l_orderkey", "l_suppkey")
        .distinct()
        .transform(materialize)
    )
    all_lines = li.select("l_orderkey", "l_suppkey").distinct()
    l2 = all_lines.select(
        F.col("l_orderkey").alias("o2_orderkey"), F.col("l_suppkey").alias("o2_suppkey")
    )
    l3 = late.select(
        F.col("l_orderkey").alias("o3_orderkey"), F.col("l_suppkey").alias("o3_suppkey")
    )
    sole_late = (
        late.join(
            l2,
            (F.col("o2_orderkey") == F.col("l_orderkey"))
            & (F.col("o2_suppkey") != F.col("l_suppkey")),
            "left_semi",
        )
        .join(
            l3,
            (F.col("o3_orderkey") == F.col("l_orderkey"))
            & (F.col("o3_suppkey") != F.col("l_suppkey")),
            "left_anti",
        )
    )
    supp = F.broadcast(load(spark, sf_dir, "supplier").select("s_suppkey", "s_name"))
    return (
        sole_late.join(supp, F.col("s_suppkey") == F.col("l_suppkey"))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
    )
