"""Warehouse-maintenance operators: SCD Type-2 dimension build, snapshot
diffing (CDC), incremental aggregate merge, zone-map statistics, and
partition-skew diagnostics.

The reference appends raw crawl rows to warehouse tables
(``scripts/spiders/web_spider_oo.py:343-350`` — ``if_exists="append"`` into
``raw.indexing``) and leaves every downstream warehouse concern to the
"Django + PostGIS web app" future (``README.md:2``).  A production version
of that warehouse needs the table-maintenance layer this module provides:
tracking how a re-crawled page's attributes change over time (SCD2),
diffing consecutive crawl snapshots (CDC), keeping aggregates fresh
without full recompute (incremental merge), and the file/partition
statistics that make a 100 TB table scannable (zone maps, skew audits).

Scale notes (100 TB):
- SCD2 runs two windows both partitioned by the entity key — per-entity
  parallelism, no global order, state bounded by one entity's history.
- Snapshot diff is one full-outer join co-partitioned on the snapshot
  key; classification is a projection.  No second shuffle: the class
  rollup aggregates map-side first.
- Incremental merge is THE reason partial aggregation exists: per-batch
  partial states are mergeable (count/sum in exact DECIMAL), so the
  merge shuffles K×groups rows instead of rescanning N rows.
- Zone maps aggregate min/max/count per partition key with map-side
  combine — the output is metadata-sized (rows = #partitions).
- Skew stats aggregate once on the bucket key, then join the K-row
  result against its own 1-row total — both post-aggregation sides are
  metadata-sized, so the diagnostic never reshuffles the fact table.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..checkpointing import materialize
from ..functions.numerics import DEC, dsum, oracle_dsum
from ..registry import register
from ..sources.tables import load, load_spread

# Snapshot-diff simulation knobs (deterministic, mirrored in the oracle):
# every 97th order is deleted, every 13th surviving order gets a +10.00
# price correction, every 89th order re-appears as a brand-new key.
DEL_MOD = 97
CHG_MOD = 13
ADD_MOD = 89
ADD_KEY_OFFSET = 100_000_000
CHG_PRICE_DELTA = 10.0  # exactly representable in binary double

# Skew diagnostic: simulated shuffle-bucket count.
N_BUCKETS = 32


# ---------------------------------------------------------------------------
# SCD Type-2 dimension build (gaps-and-islands → validity intervals)
# ---------------------------------------------------------------------------
# Shared CTE chain: the gaps-and-islands run table (used by the SCD2
# build and the point-in-time join below).
_ORACLE_SCD2_RUNS = """ordered AS (
  SELECT user_id, event_type, ts, event_id,
         CASE WHEN lag(event_type) OVER w IS NULL
                OR lag(event_type) OVER w <> event_type THEN 1 ELSE 0 END AS chg
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
islands AS (
  SELECT user_id, event_type, ts,
         SUM(chg) OVER (PARTITION BY user_id ORDER BY ts, event_id
                        ROWS UNBOUNDED PRECEDING) AS island
  FROM ordered
),
runs AS (
  SELECT user_id,
         CAST(island AS INT) AS version,
         MIN(event_type) AS state,
         MIN(ts) AS valid_from,
         CAST(COUNT(*) AS INT) AS n_events
  FROM islands GROUP BY user_id, island
),
iv AS (
  SELECT user_id, version, state, valid_from, n_events,
         lead(valid_from) OVER (PARTITION BY user_id ORDER BY version) AS valid_to
  FROM runs
)"""


@register(
    "scd2_user_state",
    oracle=f"""
WITH {_ORACLE_SCD2_RUNS}
SELECT user_id, version, state,
       strftime(valid_from, '%Y-%m-%d %H:%M:%S') AS valid_from,
       strftime(valid_to, '%Y-%m-%d %H:%M:%S') AS valid_to,
       CAST(CASE WHEN valid_to IS NULL THEN 1 ELSE 0 END AS INT) AS is_current,
       n_events
FROM iv
""",
)
def scd2_user_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD Type-2 dimension build: collapse each user's event stream into
    validity intervals of its ``event_type`` state (gaps-and-islands), one
    row per state run with ``valid_from``/``valid_to``/``is_current`` —
    the slowly-changing-dimension shape a re-crawling warehouse needs to
    answer "what did we believe about this page, when".

    Scale: both windows partition by ``user_id`` (the entity key), so the
    build parallelizes per entity and per-task state is one entity's
    history; the run rollup between them combines map-side on the same
    key, so the whole build is ONE shuffle of the events by entity.
    """
    ev = load(spark, sf_dir, "events")
    iv = scd2_intervals(ev)
    # Timestamps are emitted as strings (the repo-wide convention: the
    # driver's collect path renders TimestampType in the PROCESS timezone,
    # so raw timestamps would hash differently under a non-UTC driver).
    fmt = "yyyy-MM-dd HH:mm:ss"
    return iv.select(
        "user_id",
        "version",
        "state",
        F.date_format("valid_from", fmt).alias("valid_from"),
        F.date_format("valid_to", fmt).alias("valid_to"),
        F.when(F.col("valid_to").isNull(), 1).otherwise(0).cast("int").alias("is_current"),
        "n_events",
    )


def scd2_intervals(ev: DataFrame) -> DataFrame:
    """Raw SCD2 validity intervals (user_id, version, state, valid_from,
    valid_to, n_events) — the gaps-and-islands build shared by
    scd2_user_state and the point-in-time join."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev = F.lag("event_type").over(w)
    chg = F.when(prev.isNull() | (prev != F.col("event_type")), 1).otherwise(0)
    islands = ev.select(
        "user_id",
        "event_type",
        "ts",
        F.sum(chg).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)).alias(
            "island"
        ),
    )
    runs = islands.groupBy("user_id", "island").agg(
        F.min("event_type").alias("state"),
        F.min("ts").alias("valid_from"),
        F.count(F.lit(1)).cast("int").alias("n_events"),
    )
    wv = Window.partitionBy("user_id").orderBy("island")
    return runs.select(
        "user_id",
        F.col("island").cast("int").alias("version"),
        "state",
        "valid_from",
        F.lead("valid_from").over(wv).alias("valid_to"),
        "n_events",
    )


@register(
    "scd2_point_in_time_join",
    oracle=f"""
WITH {_ORACLE_SCD2_RUNS},
probes AS (
  SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'
)
SELECT p.event_id, p.user_id,
       strftime(p.ts, '%Y-%m-%d %H:%M:%S') AS ts,
       i.version, i.state
FROM probes p
JOIN iv i
  ON i.user_id = p.user_id
 AND i.valid_from <= p.ts
 AND (i.valid_to IS NULL OR p.ts < i.valid_to)
""",
)
def scd2_point_in_time_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time (as-of) lookup against the SCD2 dimension: each
    purchase event joined to the dimension version that was valid at its
    timestamp — the query every warehouse with SCD2 dimensions runs to
    reconstruct historical truth.

    Plan: equi-join on the entity key (user_id) with the interval bounds
    as a residual — both sides co-partition on user_id (one shuffle
    each), and a user's interval list is small, so the residual scan is
    bounded per key; never an unbounded range join."""
    ev = load(spark, sf_dir, "events")
    iv = scd2_intervals(ev)
    probes = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", F.col("user_id").alias("p_user"), "ts"
    )
    joined = probes.join(
        iv,
        (F.col("p_user") == F.col("user_id"))
        & (F.col("valid_from") <= F.col("ts"))
        & (F.col("valid_to").isNull() | (F.col("ts") < F.col("valid_to"))),
    )
    return joined.select(
        "event_id",
        "user_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("ts"),
        "version",
        "state",
    )


# ---------------------------------------------------------------------------
# Snapshot diff (CDC between two crawl snapshots)
# ---------------------------------------------------------------------------
_ORACLE_SNAPSHOTS = f"""
old AS (SELECT o_orderkey, o_totalprice FROM orders),
new AS (
  SELECT o_orderkey,
         CASE WHEN o_orderkey % {CHG_MOD} = 0
              THEN o_totalprice + {CHG_PRICE_DELTA} ELSE o_totalprice END AS o_totalprice
  FROM orders WHERE o_orderkey % {DEL_MOD} <> 0
  UNION ALL
  SELECT o_orderkey + {ADD_KEY_OFFSET}, o_totalprice
  FROM orders WHERE o_orderkey % {ADD_MOD} = 0
)
"""


@register(
    "snapshot_diff_orders",
    oracle=f"""
WITH {_ORACLE_SNAPSHOTS},
diff AS (
  SELECT COALESCE(old.o_orderkey, new.o_orderkey) AS o_orderkey,
         CASE WHEN old.o_orderkey IS NULL THEN 'added'
              WHEN new.o_orderkey IS NULL THEN 'removed'
              WHEN old.o_totalprice <> new.o_totalprice THEN 'changed'
              ELSE 'unchanged' END AS diff_class,
         COALESCE(new.o_totalprice, 0) - COALESCE(old.o_totalprice, 0) AS delta
  FROM old FULL OUTER JOIN new USING (o_orderkey)
)
SELECT diff_class,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       MIN(o_orderkey) AS min_key,
       MAX(o_orderkey) AS max_key,
       {oracle_dsum("delta")} AS price_delta
FROM diff GROUP BY diff_class
""",
)
def snapshot_diff_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC snapshot diff: full-outer-join yesterday's and today's order
    snapshots on the key and classify every row added / removed / changed /
    unchanged, rolling up counts, key ranges, and the net price delta per
    class.  Today's snapshot is simulated deterministically (every
    {DEL_MOD}th key deleted, every {CHG_MOD}th price corrected by
    +{CHG_PRICE_DELTA}, every {ADD_MOD}th re-added under a new key) so the
    oracle reproduces it bit-identically.

    Scale: ONE co-partitioned full-outer join on the snapshot key — both
    snapshots hash-partition on ``o_orderkey``; classification is a
    projection on the joined row and the per-class rollup combines
    map-side, so nothing after the join reshuffles fact-sized data.
    """
    orders = load(spark, sf_dir, "orders")
    old = orders.select("o_orderkey", "o_totalprice")
    surviving = orders.filter(F.col("o_orderkey") % DEL_MOD != 0).select(
        "o_orderkey",
        F.when(
            F.col("o_orderkey") % CHG_MOD == 0,
            F.col("o_totalprice") + CHG_PRICE_DELTA,
        )
        .otherwise(F.col("o_totalprice"))
        .alias("o_totalprice"),
    )
    added = orders.filter(F.col("o_orderkey") % ADD_MOD == 0).select(
        (F.col("o_orderkey") + ADD_KEY_OFFSET).alias("o_orderkey"), "o_totalprice"
    )
    new = surviving.unionByName(added)
    o, n = old.alias("o"), new.alias("n")
    joined = o.join(n, on="o_orderkey", how="full_outer")
    ok, nk = F.col("o.o_totalprice"), F.col("n.o_totalprice")
    diff_class = (
        F.when(ok.isNull(), "added")
        .when(nk.isNull(), "removed")
        .when(ok != nk, "changed")
        .otherwise("unchanged")
    )
    diff = joined.select(
        "o_orderkey",
        diff_class.alias("diff_class"),
        (F.coalesce(nk, F.lit(0.0)) - F.coalesce(ok, F.lit(0.0))).alias("delta"),
    )
    return diff.groupBy("diff_class").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        F.min("o_orderkey").alias("min_key"),
        F.max("o_orderkey").alias("max_key"),
        dsum(F.col("delta")).alias("price_delta"),
    )


# ---------------------------------------------------------------------------
# Incremental aggregate maintenance (partial-state merge)
# ---------------------------------------------------------------------------
@register(
    "incremental_agg_merge",
    oracle=f"""
SELECT l_returnflag, l_linestatus,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       {oracle_dsum("l_quantity")} AS sum_qty,
       {oracle_dsum("l_extendedprice")} AS sum_price
FROM lineitem
GROUP BY l_returnflag, l_linestatus
""",
)
def incremental_agg_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental aggregate maintenance: the fact table arrives as two
    batches (old corpus vs today's increment); each batch is reduced to a
    per-group partial state (count + exact-DECIMAL sums), and the partial
    states are MERGED — never rescanning the old batch — to produce the
    same result as a full recompute.  The oracle IS the full recompute, so
    a green row proves merge(partial(A), partial(B)) = agg(A ∪ B).

    Scale: this is the materialized-view refresh shape — the merge
    shuffles ``batches × groups`` metadata-sized rows instead of N fact
    rows.  DECIMAL accumulation makes the state associative/commutative,
    so any merge tree (and any partitioning) yields identical bits.
    """
    li = load(spark, sf_dir, "lineitem")
    dec = "decimal(18,6)"

    def partial(batch: DataFrame) -> DataFrame:
        return batch.groupBy("l_returnflag", "l_linestatus").agg(
            F.count(F.lit(1)).alias("p_n"),
            F.sum(F.col("l_quantity").cast(dec)).alias("p_qty"),
            F.sum(F.col("l_extendedprice").cast(dec)).alias("p_price"),
        )

    old_batch = li.filter(F.col("l_orderkey") % 10 != 7)
    new_batch = li.filter(F.col("l_orderkey") % 10 == 7)
    merged = (
        partial(old_batch)
        .unionByName(partial(new_batch))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum("p_n").cast("bigint").alias("n_rows"),
            F.sum("p_qty").cast("double").alias("sum_qty"),
            F.sum("p_price").cast("double").alias("sum_price"),
        )
    )
    return merged


# ---------------------------------------------------------------------------
# Zone-map statistics (data-skipping metadata)
# ---------------------------------------------------------------------------
@register(
    "zone_map_orders_monthly",
    oracle="""
SELECT strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       MIN(o_orderkey) AS min_key,
       MAX(o_orderkey) AS max_key,
       MIN(o_totalprice) AS min_price,
       MAX(o_totalprice) AS max_price,
       CAST(COUNT(DISTINCT o_orderpriority) AS INT) AS n_priorities
FROM orders
GROUP BY date_trunc('month', o_orderdate)
""",
)
def zone_map_orders_monthly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zone-map build: per month-partition min/max/count statistics over
    the orders table — the data-skipping metadata (Parquet row-group
    stats, Delta file stats, Iceberg manifests) that lets a 100 TB scan
    prune partitions before reading them.

    Scale: single aggregation with map-side combine; min/max/count states
    are constant-size, output rows = #partitions (metadata-sized).
    ``MIN``/``MAX`` on doubles are exact (no accumulation), so no DECIMAL
    detour is needed.
    """
    orders = load(spark, sf_dir, "orders")
    return orders.groupBy(
        F.date_format(F.date_trunc("month", "o_orderdate"), "yyyy-MM-dd").alias("month")
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        F.min("o_orderkey").alias("min_key"),
        F.max("o_orderkey").alias("max_key"),
        F.min("o_totalprice").alias("min_price"),
        F.max("o_totalprice").alias("max_price"),
        F.countDistinct("o_orderpriority").cast("int").alias("n_priorities"),
    )


# ---------------------------------------------------------------------------
# Partition-skew diagnostics
# ---------------------------------------------------------------------------
@register(
    "partition_skew_stats",
    oracle=f"""
WITH per_bucket AS (
  SELECT CAST(user_id % {N_BUCKETS} AS INT) AS bucket,
         CAST(COUNT(*) AS BIGINT) AS n_rows
  FROM events GROUP BY user_id % {N_BUCKETS}
),
tot AS (SELECT SUM(n_rows) AS total, COUNT(*) AS k FROM per_bucket)
SELECT bucket, n_rows,
       ROUND(CAST(n_rows AS DOUBLE) / total, 6) AS share,
       ROUND(CAST(n_rows * k AS DOUBLE) / total, 6) AS skew_factor
FROM per_bucket, tot
""",
)
def partition_skew_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shuffle-skew audit: hash the events stream into {N_BUCKETS}
    simulated shuffle buckets on the join key (``user_id``) and report
    each bucket's row share and skew factor vs the mean bucket — the
    diagnostic that decides whether a key needs salting (see
    ``extensions.salted_topk_words``) or AQE skew-join splitting.

    Scale: one map-side-combined aggregation over the facts; the K-row
    result then cross-joins its own 1-row total (broadcast) — nothing
    after the first aggregation touches fact-sized data.
    """
    ev = load(spark, sf_dir, "events")
    per_bucket = ev.groupBy(
        (F.col("user_id") % N_BUCKETS).cast("int").alias("bucket")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("n_rows"))
    tot = per_bucket.agg(
        F.sum("n_rows").alias("total"), F.count(F.lit(1)).alias("k")
    )
    return per_bucket.join(F.broadcast(tot)).select(
        "bucket",
        "n_rows",
        F.round(F.col("n_rows").cast("double") / F.col("total"), 6).alias("share"),
        F.round((F.col("n_rows") * F.col("k")).cast("double") / F.col("total"), 6).alias(
            "skew_factor"
        ),
    )


# ---------------------------------------------------------------------------
# Data-quality expectations (the dbt-test / Great-Expectations shape)
# ---------------------------------------------------------------------------
@register(
    "dq_orders_expectations",
    oracle="""
SELECT 'orderkey_not_null' AS rule,
       CAST(COUNT(*) AS BIGINT) AS n_checked,
       CAST(SUM(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_violations
FROM orders
UNION ALL
SELECT 'orderkey_unique',
       CAST(COUNT(*) AS BIGINT),
       CAST(COUNT(*) - COUNT(DISTINCT o_orderkey) AS BIGINT)
FROM orders
UNION ALL
SELECT 'totalprice_positive',
       CAST(COUNT(*) AS BIGINT),
       CAST(SUM(CASE WHEN o_totalprice IS NULL OR o_totalprice <= 0 THEN 1 ELSE 0 END) AS BIGINT)
FROM orders
UNION ALL
SELECT 'custkey_in_customer',
       CAST(COUNT(*) AS BIGINT),
       CAST(SUM(CASE WHEN c.c_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey
UNION ALL
SELECT 'lineitem_orderkey_in_orders',
       CAST(COUNT(*) AS BIGINT),
       CAST(SUM(CASE WHEN o.o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
FROM lineitem l LEFT JOIN orders o ON l.l_orderkey = o.o_orderkey
""",
)
def dq_orders_expectations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declarative data-quality audit: five expectations (null, unique,
    range, two referential-integrity rules) evaluated in full and reported
    as (rule, n_checked, n_violations) — the dbt-test / expectations-suite
    contract a warehouse load runs before publishing a table.

    Scale: each rule is one aggregate or one key-join with map-side
    combine; violation COUNTS (not violating rows) come back, so output
    is rule-cardinality-sized.  The uniqueness rule is
    count − count(distinct) — no self-join; the RI rules are left joins
    on the key with a null-probe SUM, which AQE turns into broadcast
    probes when the dimension fits.
    """
    orders = load(spark, sf_dir, "orders")
    customer = load(spark, sf_dir, "customer")
    li = load(spark, sf_dir, "lineitem")

    def rule(name: str, checked: DataFrame, violation: Column) -> DataFrame:
        return checked.agg(
            F.count(F.lit(1)).cast("bigint").alias("n_checked"),
            F.sum(F.when(violation, 1).otherwise(0)).cast("bigint").alias("n_violations"),
        ).select(F.lit(name).alias("rule"), "n_checked", "n_violations")

    not_null = rule("orderkey_not_null", orders, F.col("o_orderkey").isNull())
    unique = orders.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_checked"),
        (F.count(F.lit(1)) - F.countDistinct("o_orderkey")).cast("bigint").alias("n_violations"),
    ).select(F.lit("orderkey_unique").alias("rule"), "n_checked", "n_violations")
    positive = rule(
        "totalprice_positive",
        orders,
        F.col("o_totalprice").isNull() | (F.col("o_totalprice") <= 0),
    )
    ri_cust = rule(
        "custkey_in_customer",
        orders.join(
            customer.select(F.col("c_custkey")), orders.o_custkey == F.col("c_custkey"), "left"
        ),
        F.col("c_custkey").isNull(),
    )
    ri_line = rule(
        "lineitem_orderkey_in_orders",
        li.join(
            orders.select(F.col("o_orderkey").alias("ok")), li.l_orderkey == F.col("ok"), "left"
        ),
        F.col("ok").isNull(),
    )
    return not_null.unionByName(unique).unionByName(positive).unionByName(ri_cust).unionByName(ri_line)


# ---------------------------------------------------------------------------
# Deletion cascade audit (right-to-be-forgotten propagation)
# ---------------------------------------------------------------------------
@register(
    "forget_customers_cascade",
    oracle="""
WITH forget AS (SELECT c_custkey FROM customer WHERE c_custkey % 97 = 0),
del_orders AS (
  SELECT o_orderkey FROM orders WHERE o_custkey IN (SELECT c_custkey FROM forget)
)
SELECT 'customer' AS table_name,
       CAST((SELECT COUNT(*) FROM forget) AS BIGINT) AS n_delete,
       CAST((SELECT COUNT(*) FROM customer) - (SELECT COUNT(*) FROM forget) AS BIGINT) AS n_keep
UNION ALL
SELECT 'orders',
       CAST((SELECT COUNT(*) FROM del_orders) AS BIGINT),
       CAST((SELECT COUNT(*) FROM orders) - (SELECT COUNT(*) FROM del_orders) AS BIGINT)
UNION ALL
SELECT 'lineitem',
       CAST((SELECT COUNT(*) FROM lineitem WHERE l_orderkey IN (SELECT o_orderkey FROM del_orders)) AS BIGINT),
       CAST((SELECT COUNT(*) FROM lineitem WHERE l_orderkey NOT IN (SELECT o_orderkey FROM del_orders)) AS BIGINT)
""",
)
def forget_customers_cascade(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deletion-cascade audit: given a forget-list of customers (synthetic
    ``c_custkey % 97 = 0`` stand-in for a real request table), report per
    table how many rows the cascade deletes vs keeps —
    customer → orders → lineitem, the dry-run a privacy pipeline prints
    before rewriting 100 TB.

    The cascade is two LEFT SEMI joins on the foreign keys (forget-list
    broadcast; the orders key-set likewise metadata-sized relative to the
    fact table); counts are map-side-combined aggregates.  The actual
    delete at scale is the same plan with an ANTI join feeding a
    partition-overwrite write — the audit and the rewrite share their
    join tree.
    """
    customer = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")

    forget = customer.filter(F.col("c_custkey") % 97 == 0).select("c_custkey")
    del_orders = orders.join(
        F.broadcast(forget), orders.o_custkey == forget.c_custkey, "left_semi"
    ).select("o_orderkey")

    def audit(name: str, table: DataFrame, deleted: DataFrame) -> DataFrame:
        return (
            table.agg(F.count(F.lit(1)).alias("n_total"))
            .crossJoin(deleted.agg(F.count(F.lit(1)).alias("n_delete")))
            .select(
                F.lit(name).alias("table_name"),
                F.col("n_delete").cast("bigint"),
                (F.col("n_total") - F.col("n_delete")).cast("bigint").alias("n_keep"),
            )
        )

    del_li = li.join(
        F.broadcast(del_orders), li.l_orderkey == del_orders.o_orderkey, "left_semi"
    )
    return (
        audit("customer", customer, forget)
        .unionByName(audit("orders", orders, del_orders))
        .unionByName(audit("lineitem", li, del_li))
    )


# ---------------------------------------------------------------------------
# Z-order layout statistics (multi-dimensional clustering for data skipping)
# ---------------------------------------------------------------------------
_Z_BITS = 8  # 8 bits per dimension → 16-bit Morton code → 1024 64-code blocks


def _interleave_sql(b1: str, b2: str) -> str:
    """16-bit Morton code: bit i of b1 → position 2i+1, of b2 → 2i.
    Pure integer arithmetic, identical text in Spark SQL and DuckDB."""
    terms = []
    for i in range(_Z_BITS):
        terms.append(f"((({b1} >> {i}) & 1) << {2 * i + 1})")
        terms.append(f"((({b2} >> {i}) & 1) << {2 * i})")
    return "(" + " + ".join(terms) + ")"


_Z_ORACLE = f"""
WITH dims AS (
  SELECT o_orderkey, o_custkey,
         CAST(epoch_us(o_orderdate) // 86400000000 AS BIGINT) AS d
  FROM orders
),
bounds AS (
  SELECT MIN(o_custkey) AS min_c, MAX(o_custkey) AS max_c,
         MIN(d) AS min_d, MAX(d) AS max_d
  FROM dims
),
bucketed AS (
  SELECT o_orderkey, o_custkey, d,
         CAST((o_custkey - min_c) * 256 // (max_c - min_c + 1) AS BIGINT) AS b1,
         CAST((d - min_d) * 256 // (max_d - min_d + 1) AS BIGINT) AS b2
  FROM dims CROSS JOIN bounds
),
coded AS (
  SELECT o_orderkey, o_custkey, d, {_interleave_sql('b1', 'b2')} AS z FROM bucketed
)
SELECT CAST(z // 64 AS INT) AS z_block,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       MIN(o_custkey) AS min_custkey, MAX(o_custkey) AS max_custkey,
       MIN(d) AS min_day, MAX(d) AS max_day
FROM coded
GROUP BY z // 64
"""


@register("zorder_layout_stats", oracle=_Z_ORACLE)
def zorder_layout_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order (Morton) clustering key over (customer, order day) and the
    per-block min/max stats that key induces — the multi-dimensional
    data-layout companion to zone maps: sort a table by Z instead of one
    column and BOTH dimensions get bounded per-file ranges, so filters on
    either (or both) skip files.  This is what Delta's Z-ORDER / Iceberg's
    sort-order clustering computes before a rewrite.

    Plan: dimension bounds from a 1-row aggregate (broadcast back — no
    driver round-trip); range-bucketing and the 16-bit bit-interleave are
    pure integer projections; the block rollup is one map-side-combined
    aggregate of 1024 rows.  The min/max spans in the output ARE the
    proof of locality — each z-block covers ≈1/32 of each dimension's
    range instead of all of it.
    """
    dims = load(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_custkey",
        (F.unix_micros(F.col("o_orderdate").cast("timestamp")) / 86_400_000_000)
        .cast("bigint")
        .alias("d"),
    )
    bounds = dims.agg(
        F.min("o_custkey").alias("min_c"),
        F.max("o_custkey").alias("max_c"),
        F.min("d").alias("min_d"),
        F.max("d").alias("max_d"),
    )
    bucketed = dims.crossJoin(F.broadcast(bounds)).select(
        "o_orderkey",
        "o_custkey",
        "d",
        F.floor(
            (F.col("o_custkey") - F.col("min_c")) * 256 / (F.col("max_c") - F.col("min_c") + 1)
        ).alias("b1"),
        F.floor(
            (F.col("d") - F.col("min_d")) * 256 / (F.col("max_d") - F.col("min_d") + 1)
        ).alias("b2"),
    )
    coded = bucketed.withColumn("z", F.expr(_interleave_sql("b1", "b2")))
    return coded.groupBy(F.floor(F.col("z") / 64).cast("int").alias("z_block")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        F.min("o_custkey").alias("min_custkey"),
        F.max("o_custkey").alias("max_custkey"),
        F.min("d").alias("min_day"),
        F.max("d").alias("max_day"),
    )


# ---------------------------------------------------------------------------
# Checksum drill-down reconciliation (find divergent rows, touch only
# divergent blocks)
# ---------------------------------------------------------------------------
_DRILL_BLOCKS = 64
_DRILL_MOD = 997  # rows with o_orderkey % 997 == 17 diverge in copy B

_DRILL_HASH = (
    "CAST('0x' || substr(md5(CAST(o_orderkey AS VARCHAR) || '|' || "
    "CAST(CAST({price} AS DECIMAL(18,2)) AS VARCHAR)), 1, 8) AS BIGINT)"
)


@register(
    "checksum_drilldown_diff",
    oracle=f"""
WITH a AS (SELECT o_orderkey, o_totalprice FROM orders),
b AS (SELECT o_orderkey,
             CASE WHEN o_orderkey % {_DRILL_MOD} = 17
                  THEN o_totalprice + 1.0 ELSE o_totalprice END AS o_totalprice
      FROM orders),
ca AS (SELECT o_orderkey % {_DRILL_BLOCKS} AS block,
              CAST(SUM(CAST({_DRILL_HASH.format(price='o_totalprice')}
                   AS DECIMAL(20,0))) AS DECIMAL(38,0)) AS cs
       FROM a GROUP BY block),
cb AS (SELECT o_orderkey % {_DRILL_BLOCKS} AS block,
              CAST(SUM(CAST({_DRILL_HASH.format(price='o_totalprice')}
                   AS DECIMAL(20,0))) AS DECIMAL(38,0)) AS cs
       FROM b GROUP BY block),
bad AS (SELECT ca.block FROM ca JOIN cb USING (block) WHERE ca.cs <> cb.cs)
SELECT a.o_orderkey,
       a.o_totalprice AS price_a,
       b.o_totalprice AS price_b
FROM a JOIN b USING (o_orderkey)
WHERE a.o_orderkey % {_DRILL_BLOCKS} IN (SELECT block FROM bad)
  AND a.o_totalprice <> b.o_totalprice
""",
)
def checksum_drilldown_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reconciliation drill-down: two table copies (B has a planted price
    drift on ~1/{_DRILL_MOD} of keys) are compared by per-block
    checksums FIRST — only blocks whose checksums disagree get their
    rows compared.  The O(diff) completion of block_checksum_orders'
    move-no-data audit: at 100 TB the row-level comparison touches
    1/{_DRILL_BLOCKS} of the table per divergent block, not the whole
    copy.

    Plan: two map-side-combined checksum aggregates ({_DRILL_BLOCKS}
    rows each); the divergent-block list broadcasts into the row-compare
    join's scan filter."""
    a = load(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    b = a.select(
        "o_orderkey",
        F.when(
            F.col("o_orderkey") % _DRILL_MOD == 17, F.col("o_totalprice") + 1.0
        )
        .otherwise(F.col("o_totalprice"))
        .alias("o_totalprice"),
    )

    def cksum(df: DataFrame) -> DataFrame:
        h = F.conv(
            F.substring(
                F.md5(
                    F.concat_ws(
                        "|",
                        F.col("o_orderkey").cast("string"),
                        F.col("o_totalprice").cast("decimal(18,2)").cast("string"),
                    )
                ),
                1,
                8,
            ),
            16,
            10,
        ).cast("decimal(20,0)")
        return df.groupBy((F.col("o_orderkey") % _DRILL_BLOCKS).alias("block")).agg(
            F.sum(h).cast("decimal(38,0)").alias("cs")
        )

    bad = (
        cksum(a)
        .alias("ca")
        .join(cksum(b).alias("cb"), "block")
        .filter(F.col("ca.cs") != F.col("cb.cs"))
        .select("block")
    )
    rows = (
        a.alias("a")
        .join(b.alias("b"), "o_orderkey")
        .withColumn("block", F.col("o_orderkey") % _DRILL_BLOCKS)
        .join(F.broadcast(bad), "block", "left_semi")
        .filter(F.col("a.o_totalprice") != F.col("b.o_totalprice"))
    )
    return rows.select(
        "o_orderkey",
        F.col("a.o_totalprice").alias("price_a"),
        F.col("b.o_totalprice").alias("price_b"),
    )


# ---------------------------------------------------------------------------
# Small-file compaction planning (bin packing by running size)
# ---------------------------------------------------------------------------
_COMPACT_TARGET = 64 * 1024  # target compacted-file size (bytes, fixture-scaled)


@register(
    "compaction_bin_packing",
    oracle=f"""
WITH files AS (
  SELECT source, doc_id AS file_id, n_chars AS bytes,
         COALESCE(SUM(n_chars) OVER (PARTITION BY source ORDER BY doc_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS before
  FROM documents
),
planned AS (
  SELECT source, file_id, bytes,
         CAST(FLOOR(before / {_COMPACT_TARGET}) AS INT) AS bin
  FROM files
)
SELECT source, bin,
       COUNT(*) AS n_files,
       CAST(SUM(bytes) AS BIGINT) AS total_bytes
FROM planned GROUP BY source, bin
""",
)
def compaction_bin_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-file compaction plan: assign each file (simulated here by a
    document's byte size) to a target-sized output bin by running
    cumulative size within its partition — the OPTIMIZE/compact planning
    step every lakehouse table needs once streaming ingest has sprayed
    thousands of under-sized files.

    The assignment is the deterministic first-fit of files in id order:
    bin = floor(bytes_before / target).  Deterministic means the plan is
    reproducible and both engines agree exactly — no greedy heuristic
    with engine-dependent iteration order.

    Plan at 100 TB: the window is partitioned by the table partition key
    (source), so each partition's running sum is independent — this is
    per-partition metadata work over file MANIFESTS (rows = #files, not
    #records), never over table data."""
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    files = load(spark, sf_dir, "documents").select(
        "source",
        F.col("doc_id").alias("file_id"),
        F.col("n_chars").alias("bytes"),
        F.coalesce(F.sum("n_chars").over(w), F.lit(0)).alias("before"),
    )
    return (
        files.select(
            "source",
            "bytes",
            F.floor(F.col("before") / _COMPACT_TARGET).cast("int").alias("bin"),
        )
        .groupBy("source", "bin")
        .agg(
            F.count(F.lit(1)).alias("n_files"),
            F.sum("bytes").alias("total_bytes"),
        )
    )


# ---------------------------------------------------------------------------
# Pareto frontier (skyline): best price for every date horizon
# ---------------------------------------------------------------------------


@register(
    "pareto_frontier_orders",
    oracle="""
WITH daily AS (
  SELECT o_orderdate AS d, MAX(o_totalprice) AS day_max
  FROM orders GROUP BY o_orderdate
)
SELECT d AS o_orderdate, day_max AS max_price
FROM (
  SELECT d, day_max,
         MAX(day_max) OVER (ORDER BY d
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS best_before
  FROM daily
) t
WHERE best_before IS NULL OR day_max > best_before
""",
)
def pareto_frontier_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-D skyline (Pareto frontier): the days whose maximum order price
    beats every EARLIER day — the non-dominated set under (earlier date,
    higher price).  The skyline/top-k-tradeoff operator behind
    best-offer-so-far, record-progression, and cheapest-by-deadline
    queries.

    Scalable shape: raw rows collapse to per-day maxima FIRST (map-side
    combined aggregate; output is calendar-sized), and only that
    metadata-sized series goes through the running-max window — the
    global ORDER BY the textbook skyline needs never touches row-level
    data.  The window is single-partition, but over |distinct dates|
    rows (~2.4 k for 100 TB of TPC-H), which is free."""
    daily = (
        load(spark, sf_dir, "orders")
        .groupBy(F.col("o_orderdate").alias("d"))
        .agg(F.max("o_totalprice").alias("day_max"))
    )
    w = Window.orderBy("d").rowsBetween(Window.unboundedPreceding, -1)
    frontier = daily.select(
        "d", "day_max", F.max("day_max").over(w).alias("best_before")
    ).filter(F.col("best_before").isNull() | (F.col("day_max") > F.col("best_before")))
    return frontier.select(
        F.col("d").alias("o_orderdate"), F.col("day_max").alias("max_price")
    )


# ---------------------------------------------------------------------------
# Incremental view maintenance for a JOIN view (full delta rule)
# ---------------------------------------------------------------------------
IVM_CUTOFF = "1995-01-01"

_IVM_REV = "l_extendedprice * (1 - l_discount)"


@register(
    "ivm_join_delta",
    oracle=f"""
SELECT strftime(date_trunc('month', o.o_orderdate), '%Y-%m') AS month,
       CAST(COUNT(*) AS BIGINT) AS n_lines,
       ROUND({oracle_dsum(_IVM_REV)}, 6) AS revenue
FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
GROUP BY month
""",
)
def ivm_join_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental maintenance of a JOIN view via the full bilinear delta
    rule.  The view is monthly line revenue over orders ⋈ lineitem; both
    base tables receive a batch of new rows (everything dated ≥
    {IVM_CUTOFF} plays the delta).  Instead of re-joining the full
    tables, the maintained result is

        V_new = V_old  ∪  ΔO ⋈ L_old  ∪  O_old ⋈ ΔL  ∪  ΔO ⋈ ΔL

    re-aggregated by month — the algebra every materialized-view engine
    (and streaming join) implements.  The oracle recomputes the view
    FROM SCRATCH on the full tables, so a value match proves the delta
    decomposition exactly reconstructs the direct join: partial DECIMAL
    sums are associative, so "sum of four partial aggregates" ==
    "one aggregate over the union".

    Plan at 100 TB: the three delta joins are keyed on the same
    orderkey; the delta sides are batch-sized, so ΔO ⋈ L_old and
    O_old ⋈ ΔL broadcast their delta when it fits and the big sides
    are touched ONCE each — never the old ⋈ old recompute, which is the
    entire point (V_old is a stored metadata-sized aggregate)."""
    cutoff = F.lit(IVM_CUTOFF).cast("date")
    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    li = load_spread(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_shipdate", "l_extendedprice", "l_discount"
    )
    o_old, o_new = o.filter(F.col("o_orderdate") < cutoff), o.filter(
        F.col("o_orderdate") >= cutoff
    )
    l_old, l_new = li.filter(F.col("l_shipdate") < cutoff), li.filter(
        F.col("l_shipdate") >= cutoff
    )

    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))

    def monthly(orders_side: DataFrame, lines_side: DataFrame) -> DataFrame:
        j = orders_side.join(
            lines_side, orders_side.o_orderkey == lines_side.l_orderkey
        )
        return j.groupBy(
            F.date_format(F.date_trunc("month", "o_orderdate"), "yyyy-MM").alias(
                "month"
            )
        ).agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.sum(rev.cast(DEC)).alias("rev_part"),
        )

    v_old = monthly(o_old, l_old)  # the stored view (recomputed here once)
    parts = (
        v_old.unionAll(monthly(o_new, l_old))
        .unionAll(monthly(o_old, l_new))
        .unionAll(monthly(o_new, l_new))
    )
    return parts.groupBy("month").agg(
        F.sum("n_lines").alias("n_lines"),
        F.round(F.sum("rev_part").cast("double"), 6).alias("revenue"),
    )


# ---------------------------------------------------------------------------
# Privacy audit: k-anonymity / l-diversity over quasi-identifiers
# ---------------------------------------------------------------------------
K_ANON = 5  # minimum safe equivalence-class size
SENS_BUCKET = 1000  # sensitive attribute: order price bucketed to $1000


@register(
    "k_anonymity_audit",
    oracle=f"""
WITH q AS (
  SELECT CAST(EXTRACT(year FROM o_orderdate) AS INT) AS yr,
         o_orderpriority AS qi_priority, o_orderstatus AS qi_status,
         CAST(FLOOR(o_totalprice / {SENS_BUCKET}) AS BIGINT) AS sens
  FROM orders
),
classes AS (
  SELECT yr, qi_priority, qi_status,
         COUNT(*) AS class_size,
         COUNT(DISTINCT sens) AS l_div
  FROM q GROUP BY yr, qi_priority, qi_status
)
SELECT yr,
       CAST(COUNT(*) AS BIGINT) AS n_classes,
       CAST(MIN(class_size) AS BIGINT) AS k_min,
       CAST(SUM(CASE WHEN class_size < {K_ANON} THEN 1 ELSE 0 END) AS BIGINT)
         AS n_small_classes,
       CAST(SUM(CASE WHEN class_size < {K_ANON} THEN class_size ELSE 0 END) AS BIGINT)
         AS n_rows_suppressed,
       CAST(MIN(l_div) AS BIGINT) AS l_div_min
FROM classes GROUP BY yr
""",
)
def k_anonymity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Privacy audit before a table leaves the warehouse: group rows into
    equivalence classes on the quasi-identifiers (order year, priority,
    status), report per-year k-anonymity (minimum class size, classes
    and rows below k={K_ANON} — the rows generalization/suppression must
    handle) and l-diversity of the bucketed sensitive attribute (price
    band) — a class where every member shares one sensitive value leaks
    it even when k is satisfied.

    All integer arithmetic — counts, distinct counts, floors — so both
    engines agree exactly with no rounding discipline.

    Plan at 100 TB: one aggregate on the QI key (map-side combinable,
    COUNT DISTINCT via partial sets per class is bounded by the price-
    band alphabet), then a metadata-sized per-year rollup.  The audit
    never joins the fact table to anything."""
    orders = load(spark, sf_dir, "orders")
    q = orders.select(
        F.year("o_orderdate").cast("int").alias("yr"),
        F.col("o_orderpriority").alias("qi_priority"),
        F.col("o_orderstatus").alias("qi_status"),
        F.floor(F.col("o_totalprice") / SENS_BUCKET).cast("bigint").alias("sens"),
    )
    classes = q.groupBy("yr", "qi_priority", "qi_status").agg(
        F.count(F.lit(1)).alias("class_size"),
        F.countDistinct("sens").alias("l_div"),
    )
    return classes.groupBy("yr").agg(
        F.count(F.lit(1)).alias("n_classes"),
        F.min("class_size").alias("k_min"),
        F.sum(F.when(F.col("class_size") < K_ANON, 1).otherwise(0)).alias(
            "n_small_classes"
        ),
        F.sum(
            F.when(F.col("class_size") < K_ANON, F.col("class_size")).otherwise(0)
        ).alias("n_rows_suppressed"),
        F.min("l_div").alias("l_div_min"),
    )


# ---------------------------------------------------------------------------
# Optimizer statistics: join-cardinality estimation audit
# ---------------------------------------------------------------------------
JCE_SAMPLE_DEN = 8  # universe key-sample rate 1/8 (md5-bucket of the key)
JCE_HIST_BUCKETS = 64  # equi-width key histogram buckets


@register(
    "join_cardinality_estimates",
    oracle=f"""
WITH exact AS (
  SELECT COUNT(*) AS n
  FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
),
samp AS (
  -- UNIVERSE sampling: sample KEYS (same hash both sides), so every
  -- joined pair of a sampled key survives; estimate = n / rate
  SELECT COUNT(*) AS n
  FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
  WHERE CAST(('0x' || substr(md5('jce|' || CAST(o.o_custkey AS VARCHAR)), 1, 8))
             AS BIGINT) % {JCE_SAMPLE_DEN} = 0
),
ha AS (
  SELECT o_custkey % {JCE_HIST_BUCKETS} AS b,
         COUNT(*) AS na, COUNT(DISTINCT o_custkey) AS va
  FROM orders GROUP BY 1
),
hb AS (
  SELECT c_custkey % {JCE_HIST_BUCKETS} AS b,
         COUNT(*) AS nb, COUNT(DISTINCT c_custkey) AS vb
  FROM customer GROUP BY 1
),
hist AS (
  SELECT CAST(FLOOR(SUM(CAST(na AS DOUBLE) * nb / GREATEST(va, vb))) AS BIGINT) AS est
  FROM ha JOIN hb USING (b)
)
SELECT exact.n AS exact_rows,
       CAST(samp.n * {JCE_SAMPLE_DEN} AS BIGINT) AS est_sample,
       hist.est AS est_hist,
       ROUND(ABS(CAST(samp.n * {JCE_SAMPLE_DEN} AS DOUBLE) - exact.n) / exact.n, 6)
         AS err_sample,
       ROUND(ABS(CAST(hist.est AS DOUBLE) - exact.n) / exact.n, 6) AS err_hist
FROM exact CROSS JOIN samp CROSS JOIN hist
""",
)
def join_cardinality_estimates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-cardinality estimation audit — the statistic a cost-based
    optimizer lives or dies on, computed three ways over the
    orders⋈customer key: EXACT (ground truth), UNIVERSE KEY-SAMPLING
    (sample keys by md5 at rate 1/{JCE_SAMPLE_DEN} on BOTH sides — all
    pairs of a sampled key survive, so estimate = count/rate; the
    correlated-sampling trick plain row-sampling gets wrong), and a
    per-bucket SYSTEM-R HISTOGRAM refinement
    (Σ_b n_a·n_b / max(v_a, v_b)).  Emits both estimates and their
    relative errors — the audit a warehouse runs when deciding whether
    its statistics are stale.

    Plan at 100 TB: the sample estimate joins 1/{JCE_SAMPLE_DEN} of the
    keys (filter pushed to both scans); histograms are metadata-sized
    map-side aggregates; nothing quadratic anywhere."""
    orders = load(spark, sf_dir, "orders")
    cust = load(spark, sf_dir, "customer")
    exact = (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .agg(F.count(F.lit(1)).alias("n"))
    )
    keyhash = (
        F.conv(
            F.substring(F.md5(F.concat(F.lit("jce|"), F.col("o_custkey").cast("string"))), 1, 8),
            16,
            10,
        ).cast("bigint")
        % JCE_SAMPLE_DEN
    )
    samp = (
        orders.filter(keyhash == 0)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .agg(F.count(F.lit(1)).alias("n"))
    )
    ha = orders.groupBy((F.col("o_custkey") % JCE_HIST_BUCKETS).alias("b")).agg(
        F.count(F.lit(1)).alias("na"), F.countDistinct("o_custkey").alias("va")
    )
    hb = cust.groupBy((F.col("c_custkey") % JCE_HIST_BUCKETS).alias("b")).agg(
        F.count(F.lit(1)).alias("nb"), F.countDistinct("c_custkey").alias("vb")
    )
    hist = ha.join(hb, "b").agg(
        F.floor(
            F.sum(F.col("na").cast("double") * F.col("nb") / F.greatest("va", "vb"))
        ).cast("bigint").alias("est")
    )
    ex = exact.select(F.col("n").alias("exact_rows"))
    sp = samp.select((F.col("n") * JCE_SAMPLE_DEN).cast("bigint").alias("est_sample"))
    hs = hist.select(F.col("est").alias("est_hist"))
    return (
        ex.crossJoin(sp)
        .crossJoin(hs)
        .select(
            "exact_rows",
            "est_sample",
            "est_hist",
            F.round(
                F.abs(F.col("est_sample").cast("double") - F.col("exact_rows"))
                / F.col("exact_rows"),
                6,
            ).alias("err_sample"),
            F.round(
                F.abs(F.col("est_hist").cast("double") - F.col("exact_rows"))
                / F.col("exact_rows"),
                6,
            ).alias("err_hist"),
        )
    )


# ---------------------------------------------------------------------------
# Column encoding advisor: dictionary / RLE / plain, from measured stats
# ---------------------------------------------------------------------------
ENC_DICT_NDV_CAP = 1024  # dictionary pages stop paying above this alphabet
ENC_DICT_RATIO_CAP = 0.1  # ...or when ndv/rows says values rarely repeat
ENC_RLE_RUN_MIN = 4.0  # mean run length where RLE beats plain dictionary

_ENC_COLUMNS = (
    "l_returnflag",
    "l_linestatus",
    "l_quantity",
    "l_discount",
    "l_shipdate",
    "l_suppkey",
)


def _enc_choice_sql(prefix: str) -> str:
    return f"""CASE
  WHEN {prefix}ndv <= {ENC_DICT_NDV_CAP}
       AND {prefix}ndv_ratio <= {ENC_DICT_RATIO_CAP}
  THEN CASE WHEN {prefix}avg_run_len >= {ENC_RLE_RUN_MIN}
            THEN 'RLE_DICTIONARY' ELSE 'DICTIONARY' END
  ELSE 'PLAIN' END"""


@register(
    "encoding_plan_audit",
    oracle=f"""
WITH flagged AS (
  SELECT {", ".join(
    f'''CASE WHEN LAG({c}) OVER w IS NULL OR LAG({c}) OVER w <> {c}
        THEN 1 ELSE 0 END AS start_{c}''' for c in _ENC_COLUMNS)}
  FROM lineitem
  WINDOW w AS (PARTITION BY l_orderkey
               ORDER BY l_linenumber, l_partkey, l_suppkey)
),
runs AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
         {", ".join(f"CAST(SUM(start_{c}) AS BIGINT) AS runs_{c}" for c in _ENC_COLUMNS)}
  FROM flagged
),
ndvs AS (
  SELECT {", ".join(f"CAST(COUNT(DISTINCT {c}) AS BIGINT) AS ndv_{c}" for c in _ENC_COLUMNS)}
  FROM lineitem
),
percol AS (
  {" UNION ALL ".join(f'''
  SELECT '{c}' AS column_name, n_rows, ndv_{c} AS ndv,
         ROUND(CAST(ndv_{c} AS DOUBLE) / n_rows, 6) AS ndv_ratio,
         runs_{c} AS n_runs,
         ROUND(CAST(n_rows AS DOUBLE) / runs_{c}, 6) AS avg_run_len
  FROM runs CROSS JOIN ndvs''' for c in _ENC_COLUMNS)}
)
SELECT column_name, n_rows, ndv, ndv_ratio, n_runs, avg_run_len,
       {_enc_choice_sql("")} AS encoding
FROM percol ORDER BY column_name
""",
)
def encoding_plan_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Storage-encoding advisor: for each candidate lineitem column,
    measure the alphabet size (ndv), its ratio to row count, and the
    mean run length under the table's natural (l_orderkey,
    l_linenumber) clustering, then recommend RLE_DICTIONARY /
    DICTIONARY / PLAIN by the standard parquet heuristics (dictionary
    pays while the alphabet is small AND repetitive; RLE on top pays
    when values arrive in runs).  At 100 TB this table IS the writer
    config review: a fact table written with the wrong encodings costs
    2-5× the scan bytes of the right ones, and the run-length column is
    exactly what a sort/Z-order layout change improves
    (``zorder_layout_stats`` prices the layout; this prices the
    encoding).

    Runs are counted within each l_orderkey group — the row-group-local
    view an encoder actually sees under the natural clustering — via ONE
    partitioned window pass; ndv is one aggregate over the same scan.
    No global sort anywhere.

    Determinism: counts and run tallies are exact integers; the two
    ratios are single IEEE divisions rounded to 6; the recommendation is
    a CASE over those rounded values, identical text in both engines."""
    li = load(spark, sf_dir, "lineitem")
    # (l_linenumber alone is NOT unique within an order in this fixture;
    # the partkey/suppkey tiebreakers make the run order total.)
    w = Window.partitionBy("l_orderkey").orderBy(
        "l_linenumber", "l_partkey", "l_suppkey"
    )
    flagged = li.select(
        *[
            F.when(
                F.lag(c).over(w).isNull() | (F.lag(c).over(w) != F.col(c)), 1
            )
            .otherwise(0)
            .alias(f"start_{c}")
            for c in _ENC_COLUMNS
        ]
    )
    runs = flagged.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        *[
            F.sum(f"start_{c}").cast("bigint").alias(f"runs_{c}")
            for c in _ENC_COLUMNS
        ],
    )
    # One distinct-aggregate PER COLUMN, unioned — NOT a multi-column
    # countDistinct, which Catalyst rewrites into an EXPAND that shuffles
    # the fact table once per column (measured 6.9 GB at the 100× tier vs
    # ~the alphabet sizes for this shape: each leg's map-side partial
    # distinct collapses to ndv rows per task before its exchange).
    ndv_tbl = None
    for c in _ENC_COLUMNS:
        leg = (
            # isNotNull: COUNT(DISTINCT) excludes NULL in both engines,
            # but a bare distinct() keeps the NULL group — a +1 ndv drift
            # on any nullable column (latent on NOT NULL lineitem).
            li.select(c)
            .where(F.col(c).isNotNull())
            .distinct()
            .agg(F.count(F.lit(1)).cast("bigint").alias("ndv"))
            .select(F.lit(c).alias("column_name"), "ndv")
        )
        ndv_tbl = leg if ndv_tbl is None else ndv_tbl.unionByName(leg)
    runs_tbl = runs.selectExpr(
        "n_rows",
        "stack({n}, {args}) AS (column_name, n_runs)".format(
            n=len(_ENC_COLUMNS),
            args=", ".join(f"'{c}', runs_{c}" for c in _ENC_COLUMNS),
        ),
    )
    percol = runs_tbl.join(F.broadcast(ndv_tbl), "column_name").select(
        "column_name",
        "n_rows",
        "ndv",
        F.round(F.col("ndv").cast("double") / F.col("n_rows"), 6).alias(
            "ndv_ratio"
        ),
        "n_runs",
        F.round(F.col("n_rows").cast("double") / F.col("n_runs"), 6).alias(
            "avg_run_len"
        ),
    )
    return percol.select(
        "*", F.expr(_enc_choice_sql("")).alias("encoding")
    ).orderBy("column_name")


# ---------------------------------------------------------------------------
# DP preprocessing: per-user contribution bounding
# ---------------------------------------------------------------------------
DP_USER_CAP = 5  # max events any single user may contribute


@register(
    "dp_contribution_bounding",
    oracle=f"""
WITH ranked AS (
  SELECT event_type, user_id,
         ROW_NUMBER() OVER (PARTITION BY user_id
                            ORDER BY ts, event_id) AS rn
  FROM events
),
per_user_before AS (
  SELECT event_type, user_id, CAST(COUNT(*) AS BIGINT) AS n
  FROM ranked GROUP BY event_type, user_id
),
per_user_after AS (
  SELECT event_type, user_id, CAST(COUNT(*) AS BIGINT) AS n
  FROM ranked WHERE rn <= {DP_USER_CAP} GROUP BY event_type, user_id
)
SELECT b.event_type,
       CAST(SUM(b.n) AS BIGINT) AS n_rows_before,
       CAST(SUM(COALESCE(a.n, 0)) AS BIGINT) AS n_rows_after,
       CAST(COUNT(*) AS BIGINT) AS n_users,
       CAST(MAX(b.n) AS BIGINT) AS max_user_rows_before,
       CAST(MAX(COALESCE(a.n, 0)) AS BIGINT) AS max_user_rows_after,
       ROUND(CAST(MAX(b.n) AS DOUBLE) / SUM(b.n), 6) AS max_user_share_before,
       ROUND(CAST(MAX(COALESCE(a.n, 0)) AS DOUBLE) / SUM(COALESCE(a.n, 0)), 6)
         AS max_user_share_after
FROM per_user_before b
LEFT JOIN per_user_after a
  ON a.event_type = b.event_type AND a.user_id = b.user_id
GROUP BY b.event_type
ORDER BY b.event_type
""",
)
def dp_contribution_bounding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Differential-privacy preprocessing: bound every user to their
    FIRST {DP_USER_CAP} events (deterministic (ts, event_id) order) and
    report, per event type, the row counts and the heaviest single
    user's share before vs after.  Contribution bounding is the step
    that makes a later noisy aggregate's sensitivity finite — without
    it one power user's record dominates the query and no noise scale
    is private; the before/after share columns are exactly the
    sensitivity review a DP release reads.

    Note the cap is per USER across all types (the global-sensitivity
    discipline), not per (user, type) — the per-type rollup shows where
    the trimmed rows came from.

    Determinism: the kept set is a row_number over a total per-user
    order; all counts are exact; the two shares are single divisions
    rounded to 6.

    Plan at 100 TB: one user-keyed window (the same shuffle the later
    per-user aggregate needs anyway) and a per-(type, user) rollup that
    map-side combines; nothing global, nothing quadratic."""
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ranked = ev.select(
        "event_type", "user_id", F.row_number().over(w).alias("rn")
    )
    before = ranked.groupBy("event_type", "user_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_before")
    )
    after = (
        ranked.filter(F.col("rn") <= DP_USER_CAP)
        .groupBy("event_type", "user_id")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_after"))
    )
    j = before.join(after, ["event_type", "user_id"], "left").select(
        "event_type",
        "user_id",
        "n_before",
        F.coalesce(F.col("n_after"), F.lit(0)).cast("bigint").alias("n_after"),
    )
    return (
        j.groupBy("event_type")
        .agg(
            F.sum("n_before").cast("bigint").alias("n_rows_before"),
            F.sum("n_after").cast("bigint").alias("n_rows_after"),
            F.count(F.lit(1)).cast("bigint").alias("n_users"),
            F.max("n_before").cast("bigint").alias("max_user_rows_before"),
            F.max("n_after").cast("bigint").alias("max_user_rows_after"),
            F.round(
                F.max("n_before").cast("double") / F.sum("n_before"), 6
            ).alias("max_user_share_before"),
            F.round(
                F.max("n_after").cast("double") / F.sum("n_after"), 6
            ).alias("max_user_share_after"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# Late-arriving dimension: inferred members + backfill reconciliation
# ---------------------------------------------------------------------------
LATE_DIM_MOD = 11  # customers with custkey % 11 == 0 arrive after the facts
NEVER_DIM_MOD = 33  # ...except these, which never arrive (unresolved tail)


@register(
    "late_arriving_dim_merge",
    oracle=f"""
WITH early_dim AS (
  SELECT c_custkey FROM customer WHERE c_custkey % {LATE_DIM_MOD} <> 0
),
late_dim AS (
  SELECT c_custkey FROM customer
  WHERE c_custkey % {LATE_DIM_MOD} = 0 AND c_custkey % {NEVER_DIM_MOD} <> 0
),
facts AS (SELECT o_orderkey, o_custkey FROM orders),
matched AS (
  SELECT f.o_orderkey FROM facts f JOIN early_dim d ON d.c_custkey = f.o_custkey
),
inferred_members AS (
  SELECT DISTINCT o_custkey FROM facts
  WHERE o_custkey NOT IN (SELECT c_custkey FROM early_dim)
),
backfilled AS (
  SELECT i.o_custkey FROM inferred_members i
  JOIN late_dim l ON l.c_custkey = i.o_custkey
)
SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM facts) AS n_facts,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM matched) AS n_matched_initial,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM facts) -
         (SELECT CAST(COUNT(*) AS BIGINT) FROM matched) AS n_inferred_facts,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM inferred_members) AS n_inferred_members,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM backfilled) AS n_backfilled_members,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM inferred_members) -
         (SELECT CAST(COUNT(*) AS BIGINT) FROM backfilled) AS n_unresolved_members
""",
)
def late_arriving_dim_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Late-arriving dimension handling, end to end: facts load before
    every dimension row exists (customers with custkey %
    {LATE_DIM_MOD} == 0 arrive late), so the load creates INFERRED
    members — placeholder dimension rows keyed by the orphan foreign
    key — and a later backfill merge resolves them when the real rows
    land (except the % {NEVER_DIM_MOD} == 0 tail, which never arrives
    and stays flagged).  The emitted reconciliation row — facts matched
    at load, facts parked on inferred members, members backfilled,
    members still unresolved — is the nightly report a warehouse on-call
    reads; the exact counts are the contract that the merge neither
    drops nor double-counts an orphan.

    Plan at 100 TB: one key-join of facts to the early dim, one distinct
    projection of orphan keys (map-side collapsible), one key-join of
    that metadata-sized orphan set to the late feed — the facts are
    scanned once and never re-shuffled for the backfill."""
    cust = load(spark, sf_dir, "customer").select("c_custkey")
    early = cust.filter(F.col("c_custkey") % LATE_DIM_MOD != 0)
    late = cust.filter(
        (F.col("c_custkey") % LATE_DIM_MOD == 0)
        & (F.col("c_custkey") % NEVER_DIM_MOD != 0)
    )
    facts = load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    n_facts = facts.count()
    n_matched = facts.join(
        early, facts.o_custkey == early.c_custkey, "left_semi"
    ).count()
    inferred = (
        facts.join(early, facts.o_custkey == early.c_custkey, "left_anti")
        .select("o_custkey")
        .distinct()
        .transform(materialize)
    )
    n_inferred_members = inferred.count()
    n_backfilled = inferred.join(
        late, inferred.o_custkey == late.c_custkey, "left_semi"
    ).count()
    return spark.createDataFrame(
        [
            (
                n_facts,
                n_matched,
                n_facts - n_matched,
                n_inferred_members,
                n_backfilled,
                n_inferred_members - n_backfilled,
            )
        ],
        "n_facts long, n_matched_initial long, n_inferred_facts long, "
        "n_inferred_members long, n_backfilled_members long, "
        "n_unresolved_members long",
    )
