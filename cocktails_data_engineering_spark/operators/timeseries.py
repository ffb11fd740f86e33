"""Time-series operators over the events table: spine resampling with
zero-fill, range-frame rolling aggregates, and forward fill.

The reference records crawl observations as they happen (append-per-parent,
``scripts/spiders/web_spider_oo.py:305-308``) — irregular event times.  Every
downstream consumer of such a feed (dashboards, anomaly detection, feature
stores for training) needs the regularization operators here.

Scale notes (100 TB):
- The spine is generated from a 1-row min/max aggregate — never collected
  to the driver and never materialized beyond |hours| × |types| rows.
- Rolling windows use RANGE frames over epoch-µs: one shuffle on the
  partition key (user), then a linear per-partition sweep; frame state is
  bounded by the time width, not history.
- Forward fill is ``last(..., ignorenulls)`` over the same per-user
  ordering — one shuffle, no self-join, no driver loop.
- Double sums inside window frames accumulate in DECIMAL (see
  functions/numerics) so results are identical on any partitioning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.numerics import DEC, dsum, oracle_dsum
from ..registry import register
from ..sources.tables import load, load_spread


@register(
    "resample_fill_hourly",
    oracle="""
WITH bounds AS (
  SELECT date_trunc('hour', MIN(ts)) AS lo, date_trunc('hour', MAX(ts)) AS hi FROM events
),
spine AS (
  SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS h FROM bounds
),
types AS (SELECT DISTINCT event_type FROM events),
agg AS (
  SELECT date_trunc('hour', ts) AS h, event_type,
         COUNT(*) AS n_events,
         CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
  FROM events GROUP BY 1, 2
)
SELECT strftime(s.h, '%Y-%m-%d %H:%M:%S') AS hour,
       t.event_type,
       COALESCE(a.n_events, 0) AS n_events,
       COALESCE(a.sum_value, 0.0) AS sum_value
FROM spine s CROSS JOIN types t
LEFT JOIN agg a ON a.h = s.h AND a.event_type = t.event_type
""",
)
def resample_fill_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resample the irregular event feed onto a dense hourly spine per
    event type, zero-filling empty buckets.

    A bare GROUP BY silently drops empty buckets — poison for
    rolling-window features and charting.  The spine comes from a 1-row
    min/max aggregate expanded with ``sequence`` (no driver round-trip,
    no hardcoded calendar), cross-joined with the (tiny, broadcast)
    distinct-type dimension, then left-joined to the hourly aggregate.
    """
    ev = load(spark, sf_dir, "events")
    bounds = ev.agg(
        F.date_trunc("hour", F.min("ts")).alias("lo"),
        F.date_trunc("hour", F.max("ts")).alias("hi"),
    )
    spine = bounds.select(
        F.explode(F.sequence("lo", "hi", F.expr("INTERVAL 1 HOUR"))).alias("h")
    )
    types = ev.select("event_type").distinct()
    agg = ev.groupBy(
        F.date_trunc("hour", F.col("ts")).alias("h"), "event_type"
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.col("value").cast(DEC)).cast("double").alias("sum_value"),
    )
    return (
        spine.crossJoin(F.broadcast(types))
        .join(agg, ["h", "event_type"], "left")
        .select(
            F.date_format("h", "yyyy-MM-dd HH:mm:ss").alias("hour"),
            "event_type",
            F.coalesce("n_events", F.lit(0)).alias("n_events"),
            F.coalesce("sum_value", F.lit(0.0)).alias("sum_value"),
        )
    )


@register(
    "rolling_1h_user_spend",
    oracle="""
SELECT event_id, user_id,
       epoch_us(ts) AS ts_us,
       CAST(SUM(CAST(value AS DECIMAL(18,6))) OVER (
             PARTITION BY user_id ORDER BY epoch_us(ts)
             RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW
       ) AS DOUBLE) AS spend_1h,
       COUNT(*) OVER (
             PARTITION BY user_id ORDER BY epoch_us(ts)
             RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW
       ) AS n_1h
FROM events
WHERE event_type = 'purchase'
""",
)
def rolling_1h_user_spend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per purchase, the user's trailing-1-hour spend and purchase count —
    a RANGE frame over event time (rows at identical timestamps share the
    frame, unlike a ROWS frame), the canonical sliding-feature shape.

    One shuffle on user_id; the frame is swept linearly per partition
    with state bounded by the hour width.  The frame SUM accumulates in
    DECIMAL so the trailing totals are engine- and partitioning-exact.
    """
    ev = (
        load(spark, sf_dir, "events")
        .filter(F.col("event_type") == "purchase")
        .select("event_id", "user_id", F.unix_micros("ts").alias("ts_us"), "value")
    )
    frame = (
        Window.partitionBy("user_id")
        .orderBy("ts_us")
        .rangeBetween(-3_600_000_000, 0)
    )
    return ev.select(
        "event_id",
        "user_id",
        "ts_us",
        F.sum(F.col("value").cast(DEC)).over(frame).cast("double").alias("spend_1h"),
        F.count(F.lit(1)).over(frame).alias("n_1h"),
    )


@register(
    "forward_fill_purchase_value",
    oracle="""
SELECT event_id, user_id, epoch_us(ts) AS ts_us,
       LAST_VALUE(CASE WHEN event_type = 'purchase' THEN value END IGNORE NULLS) OVER (
             PARTITION BY user_id ORDER BY epoch_us(ts), event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
       ) AS last_purchase_value
FROM events
""",
)
def forward_fill_purchase_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward fill: annotate EVERY event with the user's most recent
    purchase value at-or-before it (NULL until the first purchase) —
    last-observation-carried-forward over a sparse signal.

    ``last(..., ignorenulls)`` over a (ts, event_id)-ordered per-user
    window: one shuffle, linear sweep, O(1) state per partition — the
    same value is picked by both engines because the order key is made
    unique with the event_id tiebreak, and no arithmetic touches it.
    """
    ev = load(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        F.unix_micros("ts").alias("ts_us"),
        F.when(F.col("event_type") == "purchase", F.col("value")).alias("pv"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts_us", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return ev.select(
        "event_id",
        "user_id",
        "ts_us",
        F.last("pv", ignorenulls=True).over(w).alias("last_purchase_value"),
    )


@register(
    "funnel_user_conversion",
    oracle="""
WITH first_signup AS (
  SELECT user_id, MIN(epoch_us(ts)) AS signup_us
  FROM events WHERE event_type = 'signup' GROUP BY user_id
),
first_purchase AS (
  SELECT e.user_id, MIN(epoch_us(e.ts)) AS purchase_us
  FROM events e JOIN first_signup s
    ON s.user_id = e.user_id AND epoch_us(e.ts) >= s.signup_us
  WHERE e.event_type = 'purchase'
  GROUP BY e.user_id
)
SELECT s.user_id, s.signup_us,
       p.purchase_us,
       CAST(CASE WHEN p.purchase_us IS NULL THEN 0 ELSE 1 END AS INT) AS converted,
       (p.purchase_us - s.signup_us) // 1000000 AS convert_secs
FROM first_signup s LEFT JOIN first_purchase p USING (user_id)
""",
)
def funnel_user_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Signup→purchase funnel: for every user who ever signed up, the
    first signup, the first purchase at-or-after it, and the conversion
    lag — the product-analytics primitive behind every conversion-rate
    dashboard.

    Two aggregates keyed on user_id plus one equi-join on the same key —
    co-partitioned end to end, so the funnel costs one logical shuffle of
    the events by user.  Timestamps stay epoch-µs integers throughout
    (no float, no formatting), making every value engine-exact.
    """
    ev = load(spark, sf_dir, "events").select(
        "user_id", "event_type", F.unix_micros("ts").alias("us")
    )
    first_signup = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("us").alias("signup_us"))
    )
    first_purchase = (
        ev.filter(F.col("event_type") == "purchase")
        .join(first_signup, "user_id")
        .filter(F.col("us") >= F.col("signup_us"))
        .groupBy("user_id")
        .agg(F.min("us").alias("purchase_us"))
    )
    return first_signup.join(first_purchase, "user_id", "left").select(
        "user_id",
        "signup_us",
        "purchase_us",
        F.when(F.col("purchase_us").isNull(), 0).otherwise(1).cast("int").alias("converted"),
        ((F.col("purchase_us") - F.col("signup_us")) / F.lit(1_000_000))
        .cast("bigint")
        .alias("convert_secs"),
    )


@register(
    "retention_cohorts",
    oracle="""
WITH cohort AS (
  SELECT user_id, date_trunc('week', MIN(ts)) AS cohort_week
  FROM events WHERE event_type = 'signup' GROUP BY user_id
),
activity AS (
  SELECT DISTINCT e.user_id, date_trunc('week', e.ts) AS active_week
  FROM events e
)
SELECT strftime(c.cohort_week, '%Y-%m-%d') AS cohort_week,
       CAST((epoch(a.active_week) - epoch(c.cohort_week)) // 604800 AS INT) AS week_offset,
       CAST(COUNT(*) AS BIGINT) AS n_active_users
FROM cohort c JOIN activity a
  ON a.user_id = c.user_id AND a.active_week >= c.cohort_week
GROUP BY c.cohort_week, week_offset
""",
)
def retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly retention cohorts: users grouped by signup week, counted in
    every subsequent week they were active — the retention-triangle
    query.

    Cohort assignment and the distinct activity grid are both user-keyed
    aggregates; the cohort join is on the same key (co-partitioned), and
    the final rollup's cardinality is weeks² — metadata-sized however
    large the event log.  Week arithmetic happens on epoch seconds of
    week-truncated UTC timestamps, so offsets are exact integers in both
    engines.
    """
    ev = load(spark, sf_dir, "events")
    cohort = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.date_trunc("week", F.min("ts")).alias("cohort_week"))
    )
    activity = ev.select(
        "user_id", F.date_trunc("week", F.col("ts")).alias("active_week")
    ).distinct()
    return (
        cohort.join(activity, "user_id")
        .filter(F.col("active_week") >= F.col("cohort_week"))
        .groupBy("cohort_week", "active_week")
        .agg(F.countDistinct("user_id").alias("n_active_users"))
        .select(
            F.date_format("cohort_week", "yyyy-MM-dd").alias("cohort_week"),
            ((F.unix_timestamp("active_week") - F.unix_timestamp("cohort_week")) / 604800)
            .cast("int")
            .alias("week_offset"),
            F.col("n_active_users").cast("bigint"),
        )
    )


@register(
    "anomaly_zscore_hourly",
    oracle="""
WITH bounds AS (
  SELECT date_trunc('hour', MIN(ts)) AS lo, date_trunc('hour', MAX(ts)) AS hi FROM events
),
spine AS (
  SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS h FROM bounds
),
types AS (SELECT DISTINCT event_type FROM events),
agg AS (
  SELECT date_trunc('hour', ts) AS h, event_type, COUNT(*) AS x
  FROM events GROUP BY 1, 2
),
series AS (
  SELECT s.h, t.event_type, COALESCE(a.x, 0) AS x
  FROM spine s CROSS JOIN types t
  LEFT JOIN agg a ON a.h = s.h AND a.event_type = t.event_type
),
stats AS (
  SELECT h, event_type, x,
         COUNT(*)   OVER w AS n,
         SUM(x)     OVER w AS sx,
         SUM(x * x) OVER w AS sxx
  FROM series
  WINDOW w AS (PARTITION BY event_type ORDER BY h ROWS BETWEEN 24 PRECEDING AND 1 PRECEDING)
)
SELECT strftime(h, '%Y-%m-%d %H:%M:%S') AS hour, event_type, CAST(x AS BIGINT) AS x,
       CASE WHEN n >= 12 AND (n * sxx - sx * sx) > 0
            THEN round((x - CAST(sx AS DOUBLE) / n)
                       / sqrt(CAST(n * sxx - sx * sx AS DOUBLE) / (n * (n - 1))), 6)
       END AS zscore,
       CAST(CASE WHEN n >= 12 AND (n * sxx - sx * sx) > 0
                  AND abs(round((x - CAST(sx AS DOUBLE) / n)
                       / sqrt(CAST(n * sxx - sx * sx AS DOUBLE) / (n * (n - 1))), 6)) >= 3.0
            THEN 1
            WHEN n >= 12 AND (n * sxx - sx * sx) = 0 AND x * n <> sx
            THEN 1 ELSE 0 END AS INT) AS is_anomaly
FROM stats
""",
)
def anomaly_zscore_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-window anomaly detection: each hourly event count scored
    against the mean/std of its own preceding 24 hours (current hour
    excluded — no self-contamination), |z| ≥ 3 flagged.

    Composition of the dense spine (missing hours MUST be zeros, not
    absent, or quiet-hour anomalies are invisible) with a trailing ROWS
    frame.  Exactness: counts are integers, so the frame's Σx and Σx² are
    exact; variance is formed from one integer expression and every
    float op after it (divide, sqrt) is IEEE-correctly-rounded with an
    identical expression tree in the oracle — z-scores match to the bit,
    rounded to 6 for the output.  One shuffle on event_type for the
    window; spine cost as in resample_fill_hourly.
    """
    ev = load(spark, sf_dir, "events")
    bounds = ev.agg(
        F.date_trunc("hour", F.min("ts")).alias("lo"),
        F.date_trunc("hour", F.max("ts")).alias("hi"),
    )
    spine = bounds.select(
        F.explode(F.sequence("lo", "hi", F.expr("INTERVAL 1 HOUR"))).alias("h")
    )
    types = ev.select("event_type").distinct()
    agg = ev.groupBy(F.date_trunc("hour", F.col("ts")).alias("h"), "event_type").agg(
        F.count(F.lit(1)).alias("x")
    )
    series = (
        spine.crossJoin(F.broadcast(types))
        .join(agg, ["h", "event_type"], "left")
        .select("h", "event_type", F.coalesce("x", F.lit(0)).alias("x"))
    )
    w = Window.partitionBy("event_type").orderBy("h").rowsBetween(-24, -1)
    stats = series.select(
        "h",
        "event_type",
        "x",
        F.count(F.lit(1)).over(w).alias("n"),
        F.sum("x").over(w).alias("sx"),
        F.sum(F.col("x") * F.col("x")).over(w).alias("sxx"),
    )
    disc = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    mean = F.col("sx").cast("double") / F.col("n")
    std = F.sqrt(disc.cast("double") / (F.col("n") * (F.col("n") - 1)))
    z = F.round((F.col("x") - mean) / std, 6)
    valid = (F.col("n") >= 12) & (disc > 0)
    # Zero-variance baseline (disc = 0: 24 flat hours) leaves z undefined,
    # but ANY deviation from the flat value is infinitely many sigmas out —
    # exactly the spike a monitor most wants.  Flag x != mean via the exact
    # integer identity x*n != sx; zscore stays NULL (no finite value exists).
    flat_spike = (F.col("n") >= 12) & (disc == 0) & (
        F.col("x") * F.col("n") != F.col("sx")
    )
    return stats.select(
        F.date_format("h", "yyyy-MM-dd HH:mm:ss").alias("hour"),
        "event_type",
        F.col("x").cast("bigint").alias("x"),
        F.when(valid, z).alias("zscore"),
        F.when(valid & (F.abs(z) >= 3.0), 1)
        .when(flat_spike, 1)
        .otherwise(0)
        .cast("int")
        .alias("is_anomaly"),
    )


@register(
    "funnel_three_step",
    oracle="""
WITH s1 AS (
  SELECT user_id, MIN(epoch_us(ts)) AS t1
  FROM events WHERE event_type = 'signup' GROUP BY user_id
),
s2 AS (
  SELECT e.user_id, MIN(epoch_us(e.ts)) AS t2
  FROM events e JOIN s1 ON s1.user_id = e.user_id AND epoch_us(e.ts) >= s1.t1
  WHERE e.event_type = 'click' GROUP BY e.user_id
),
s3 AS (
  SELECT e.user_id, MIN(epoch_us(e.ts)) AS t3
  FROM events e JOIN s2 ON s2.user_id = e.user_id AND epoch_us(e.ts) >= s2.t2
  WHERE e.event_type = 'purchase' GROUP BY e.user_id
),
counts AS (
  SELECT '1_signup' AS stage, COUNT(*) AS n_users FROM s1
  UNION ALL SELECT '2_click', COUNT(*) FROM s2
  UNION ALL SELECT '3_purchase', COUNT(*) FROM s3
),
base AS (SELECT n_users AS n1 FROM counts WHERE stage = '1_signup')
SELECT c.stage, c.n_users,
       ROUND(CAST(c.n_users AS DOUBLE) / b.n1, 6) AS share_of_entry
FROM counts c CROSS JOIN base b
""",
)
def funnel_three_step(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered three-step funnel (signup → click → purchase, each step
    at-or-after the previous step's first occurrence): stage sizes and
    share of the entry cohort.  The multi-step generalization of
    funnel_user_conversion.

    Every aggregate and join is keyed on user_id — the whole funnel is
    co-partitioned on the entity key (one logical shuffle of events),
    and each extra step adds one more same-key join, not a new shuffle
    pattern.  Epoch-µs integer time math keeps it engine-exact."""
    ev = load(spark, sf_dir, "events").select(
        "user_id", "event_type", F.unix_micros("ts").alias("us")
    )
    s1 = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("us").alias("t1"))
    )
    s2 = (
        ev.filter(F.col("event_type") == "click")
        .join(s1, "user_id")
        .filter(F.col("us") >= F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("us").alias("t2"))
    )
    s3 = (
        ev.filter(F.col("event_type") == "purchase")
        .join(s2, "user_id")
        .filter(F.col("us") >= F.col("t2"))
        .groupBy("user_id")
        .agg(F.min("us").alias("t3"))
    )
    counts = (
        s1.agg(F.count(F.lit(1)).alias("n_users")).select(F.lit("1_signup").alias("stage"), "n_users")
        .unionByName(s2.agg(F.count(F.lit(1)).alias("n_users")).select(F.lit("2_click").alias("stage"), "n_users"))
        .unionByName(s3.agg(F.count(F.lit(1)).alias("n_users")).select(F.lit("3_purchase").alias("stage"), "n_users"))
    )
    base = counts.filter(F.col("stage") == "1_signup").select(F.col("n_users").alias("n1"))
    return counts.crossJoin(F.broadcast(base)).select(
        "stage",
        "n_users",
        F.round(F.col("n_users").cast("double") / F.col("n1"), 6).alias("share_of_entry"),
    )


@register(
    "monthly_revenue_growth",
    oracle=f"""
WITH monthly AS (
  SELECT strftime(date_trunc('month', o_orderdate), '%Y-%m') AS month,
         {oracle_dsum('o_totalprice')} AS revenue
  FROM orders GROUP BY date_trunc('month', o_orderdate)
)
SELECT month, ROUND(revenue, 6) AS revenue,
       ROUND((ROUND(revenue, 6) - LAG(ROUND(revenue, 6)) OVER (ORDER BY month))
             / LAG(ROUND(revenue, 6)) OVER (ORDER BY month), 6) AS mom_growth
FROM monthly
""",
)
def monthly_revenue_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Month-over-month revenue growth — the trend-report shape: one
    monthly DECIMAL-exact aggregate, then a LAG window over the (tiny)
    month domain.

    The window's ORDER BY runs over |months| rows, not over orders — the
    single-partition step is metadata-sized, which is what makes an
    otherwise forbidden global window acceptable here (same argument as
    enumerate_ids' offset table)."""
    o = load(spark, sf_dir, "orders")
    monthly = o.groupBy(
        F.date_format(F.date_trunc("month", "o_orderdate"), "yyyy-MM").alias("month")
    ).agg(F.round(dsum(F.col("o_totalprice")), 6).alias("revenue"))
    w = Window.orderBy("month")
    lag = F.lag("revenue").over(w)
    return monthly.select(
        "month",
        "revenue",
        F.round((F.col("revenue") - lag) / lag, 6).alias("mom_growth"),
    )


@register(
    "latency_percentiles_by_type",
    oracle="""
SELECT event_type,
       ROUND(CAST(quantile_cont(value, 0.5) AS DOUBLE), 6) AS p50,
       ROUND(CAST(quantile_cont(value, 0.9) AS DOUBLE), 6) AS p90,
       ROUND(CAST(quantile_cont(value, 0.99) AS DOUBLE), 6) AS p99
FROM events
WHERE value IS NOT NULL
GROUP BY event_type
""",
)
def latency_percentiles_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact P50/P90/P99 of the event value per type — the SLO/latency
    readout.  Spark's ``percentile`` and DuckDB's ``quantile_cont`` share
    the same linear-interpolation definition (pos = (n−1)·q), so the
    exact quantiles agree to rounding — extending the proven median
    parity to arbitrary q.

    Plan: exact percentiles buffer each group's values (the documented
    exactness cost — approx_percentile_prices is the sketch alternative);
    one shuffle on event_type, values spread first."""
    ev = load_spread(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    return ev.groupBy("event_type").agg(
        F.round(F.percentile("value", F.lit(0.5)), 6).alias("p50"),
        F.round(F.percentile("value", F.lit(0.9)), 6).alias("p90"),
        F.round(F.percentile("value", F.lit(0.99)), 6).alias("p99"),
    )


@register(
    "weekday_hourly_profile",
    oracle="""
SELECT CAST(date_part('dow', ts) AS INT) AS dow,
       CAST(date_part('hour', ts) AS INT) AS hour,
       COUNT(*) AS n_events
FROM events
GROUP BY dow, hour
""",
)
def weekday_hourly_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekday × hour activity heatmap — the seasonality profile behind
    capacity planning.  Cross-engine DOW trap handled explicitly:
    DuckDB's dow is 0=Sunday while Spark's dayofweek is 1=Sunday, so the
    Spark side subtracts 1 to the same 0-based convention.

    Plan: map-side date-part projection + one ≤168-group aggregate."""
    ev = load(spark, sf_dir, "events")
    return ev.groupBy(
        (F.dayofweek("ts") - 1).cast("int").alias("dow"),
        F.hour("ts").cast("int").alias("hour"),
    ).agg(F.count(F.lit(1)).alias("n_events"))


@register(
    "dau_wau_stickiness",
    oracle="""
WITH days AS (SELECT DISTINCT CAST(date_trunc('day', ts) AS DATE) AS day FROM events),
dau AS (
  SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
         COUNT(DISTINCT user_id) AS dau
  FROM events GROUP BY day
),
wau AS (
  SELECT d.day, COUNT(DISTINCT e.user_id) AS wau
  FROM days d JOIN events e
    ON CAST(date_trunc('day', e.ts) AS DATE) BETWEEN d.day - 6 AND d.day
  GROUP BY d.day
)
SELECT strftime(d.day, '%Y-%m-%d') AS day, dau.dau, wau.wau,
       ROUND(CAST(dau.dau AS DOUBLE) / wau.wau, 6) AS stickiness
FROM days d JOIN dau USING (day) JOIN wau USING (day)
""",
)
def dau_wau_stickiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DAU / trailing-7-day WAU / stickiness ratio per day — the
    engagement metric trio.  EXACT distinct over the trailing window by
    joining each day to its 7-day event slice (|days| × window fan-out);
    this is the exactness baseline whose 100 TB path is the mergeable
    HLL day-sketch union (hll_rolling_7d_users) — same numbers to sketch
    error, a fraction of the cost.

    Plan: the day spine is metadata-sized; the window join fans events
    ≤7×, then two distinct aggregates keyed (day, user)."""
    ev = load(spark, sf_dir, "events").select(
        F.to_date(F.date_trunc("day", "ts")).alias("day"), "user_id"
    )
    days = ev.select("day").distinct()
    dau = ev.groupBy("day").agg(F.count_distinct("user_id").alias("dau"))
    wau = (
        days.alias("d")
        .join(
            ev.alias("e"),
            (F.col("e.day") >= F.date_sub(F.col("d.day"), 6))
            & (F.col("e.day") <= F.col("d.day")),
        )
        .groupBy(F.col("d.day").alias("day"))
        .agg(F.count_distinct("user_id").alias("wau"))
    )
    return (
        days.join(dau, "day")
        .join(wau, "day")
        .select(
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            "dau",
            "wau",
            F.round(F.col("dau").cast("double") / F.col("wau"), 6).alias("stickiness"),
        )
    )


@register(
    "event_transition_matrix",
    oracle="""
WITH seq AS (
  SELECT user_id, event_type,
         LEAD(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS next_type
  FROM events
),
trans AS (
  SELECT event_type AS from_type, next_type AS to_type, COUNT(*) AS n
  FROM seq WHERE next_type IS NOT NULL
  GROUP BY from_type, to_type
),
tot AS (SELECT from_type, SUM(n) AS row_n FROM trans GROUP BY from_type)
SELECT t.from_type, t.to_type, t.n,
       ROUND(CAST(t.n AS DOUBLE) / tt.row_n, 6) AS p_next
FROM trans t JOIN tot tt USING (from_type)
""",
)
def event_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order behavioral transition matrix: per user-ordered event
    stream, counts and conditional probabilities of (current → next)
    event type — the Markov-chain view of user behavior (session-flow
    analysis, anomaly priors).

    Plan: ONE shuffle of events on user_id for the LEAD window, then a
    |types|²-sized aggregate; the probability normalization joins the
    (tiny) row totals back broadcast."""
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "event_type", F.lead("event_type").over(w).alias("next_type")
    ).filter(F.col("next_type").isNotNull())
    trans = seq.groupBy(
        F.col("event_type").alias("from_type"), F.col("next_type").alias("to_type")
    ).agg(F.count(F.lit(1)).alias("n"))
    tot = trans.groupBy("from_type").agg(F.sum("n").alias("row_n"))
    return trans.join(F.broadcast(tot), "from_type").select(
        "from_type",
        "to_type",
        "n",
        F.round(F.col("n").cast("double") / F.col("row_n"), 6).alias("p_next"),
    )


@register(
    "last_touch_attribution",
    oracle="""
WITH seq AS (
  SELECT user_id, event_type, ts, event_id,
         LAG(CASE WHEN event_type <> 'purchase' THEN event_type END IGNORE NULLS)
           OVER (PARTITION BY user_id ORDER BY ts, event_id) AS last_touch
  FROM events
)
SELECT COALESCE(last_touch, 'none') AS touch_type,
       COUNT(*) AS n_purchases
FROM seq WHERE event_type = 'purchase'
GROUP BY touch_type
""",
)
def last_touch_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-touch attribution: each purchase credited to the most recent
    preceding NON-purchase event of the same user (the marketing-
    attribution shape; 'none' = a purchase with no prior touch).  One
    ignore-nulls LAG over the user-ordered stream — the same
    carry-forward idiom as the as-of join and forward fill.

    Plan: ONE shuffle of events on user_id; the attribution rollup is
    |event types| rows."""
    ev = load(spark, sf_dir, "events")
    # lag(... IGNORE NULLS) spelled as last-over-preceding-frame (PySpark's
    # lag() has no ignorenulls) — identical semantics to the oracle's LAG
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    touch = F.last(
        F.when(F.col("event_type") != "purchase", F.col("event_type")),
        ignorenulls=True,
    ).over(w)
    return (
        ev.select("event_type", touch.alias("last_touch"))
        .filter(F.col("event_type") == "purchase")
        .groupBy(F.coalesce("last_touch", F.lit("none")).alias("touch_type"))
        .agg(F.count(F.lit(1)).alias("n_purchases"))
    )


# ---------------------------------------------------------------------------
# Rolling exact median (order-statistic window frame)
# ---------------------------------------------------------------------------
@register(
    "rolling_median_value",
    oracle="""
SELECT event_id, user_id,
       ROUND(CAST(quantile_cont(value, 0.5) OVER (
         PARTITION BY user_id ORDER BY ts, event_id
         ROWS BETWEEN 4 PRECEDING AND CURRENT ROW) AS DOUBLE), 6)
         AS med5
FROM events
""",
)
def rolling_median_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling exact MEDIAN of the last 5 events per user — the robust
    smoother for spiky metrics where a rolling mean chases outliers
    (the windowed order statistic beside rolling_1h_user_spend's
    additive frame).  Exact percentile over a 5-row frame is
    engine-identical (linear interpolation of two order statistics —
    no accumulation-order dependence at all), one ROUND(6).

    Plan at 100 TB: ONE shuffle on user_id, per-user ordered scan with
    a bounded 5-row frame — state per window position is 5 values, so
    the operator is memory-flat regardless of user history length."""
    ev = load_spread(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-4, 0)
    )
    return ev.select(
        "event_id",
        "user_id",
        F.round(F.percentile("value", F.lit(0.5)).over(w), 6).alias("med5"),
    )


# ---------------------------------------------------------------------------
# RFM segmentation (recency / frequency / monetary terciles)
# ---------------------------------------------------------------------------
_RFM_QS = [1 / 3, 2 / 3]


@register(
    "rfm_user_segments",
    oracle=f"""
WITH p AS (
  SELECT user_id, ts, value FROM events WHERE event_type = 'purchase'
),
mx AS (SELECT MAX(ts) AS t_max FROM p),
rfm AS (
  SELECT p.user_id,
         CAST(date_diff('second', MAX(p.ts), mx.t_max) AS BIGINT) AS recency_s,
         CAST(COUNT(*) AS BIGINT) AS frequency,
         ROUND(CAST(SUM(CAST(p.value AS DECIMAL(18,6))) AS DOUBLE), 6)
           AS monetary
  FROM p CROSS JOIN mx
  GROUP BY p.user_id, mx.t_max
),
b AS (
  SELECT list_transform(quantile_cont(recency_s, {_RFM_QS}),
                        q -> ROUND(CAST(q AS DOUBLE), 6)) AS rb,
         list_transform(quantile_cont(frequency, {_RFM_QS}),
                        q -> ROUND(CAST(q AS DOUBLE), 6)) AS fb,
         list_transform(quantile_cont(monetary, {_RFM_QS}),
                        q -> ROUND(CAST(q AS DOUBLE), 6)) AS mb
  FROM rfm
),
scored AS (
  SELECT rfm.user_id, rfm.recency_s, rfm.frequency, rfm.monetary,
         3 - CAST(len(list_filter(b.rb, q -> rfm.recency_s > q)) AS INT) AS r,
         1 + CAST(len(list_filter(b.fb, q -> rfm.frequency > q)) AS INT) AS f,
         1 + CAST(len(list_filter(b.mb, q -> rfm.monetary > q)) AS INT) AS m
  FROM rfm CROSS JOIN b
)
SELECT user_id, recency_s, frequency, monetary,
       r, f, m,
       CAST(r AS VARCHAR) || CAST(f AS VARCHAR) || CAST(m AS VARCHAR)
         AS segment
FROM scored
""",
)
def rfm_user_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM segmentation — the classic lifecycle-marketing readout: per
    user, Recency (seconds since last purchase, lower = better),
    Frequency, and Monetary (DECIMAL-exact), each scored into terciles
    against exact-quantile boundaries broadcast from one aggregate (the
    same no-NTILE shape as equidepth), concatenated into the '333' /
    '111' style segment code.  Boundary comparisons use ROUNDED
    boundaries so tercile membership is engine-exact.

    Plan at 100 TB: one user-keyed aggregate over purchases, a 1-row
    boundary aggregate broadcast back, scoring map-side — two shuffles
    total, the second over |users| rows."""
    p = load_spread(spark, sf_dir, "events").filter(
        F.col("event_type") == "purchase"
    )
    mx = F.broadcast(p.agg(F.max("ts").alias("t_max")))
    rfm = (
        p.crossJoin(mx)
        .groupBy("user_id", "t_max")
        .agg(
            F.max("ts").alias("t_last"),
            F.count(F.lit(1)).alias("frequency"),
            F.round(dsum(F.col("value")), 6).alias("monetary"),
        )
        .select(
            "user_id",
            (
                F.unix_timestamp("t_max") - F.unix_timestamp("t_last")
            ).alias("recency_s"),
            "frequency",
            "monetary",
        )
    )
    qs = F.array(*[F.lit(q) for q in _RFM_QS])
    b = F.broadcast(
        rfm.agg(
            F.transform(
                F.percentile("recency_s", qs), lambda q: F.round(q, 6)
            ).alias("rb"),
            F.transform(
                F.percentile("frequency", qs), lambda q: F.round(q, 6)
            ).alias("fb"),
            F.transform(
                F.percentile("monetary", qs), lambda q: F.round(q, 6)
            ).alias("mb"),
        )
    )
    def above(bs, col):
        return F.size(F.filter(bs, lambda q: col > q))

    scored = rfm.crossJoin(b).select(
        "user_id",
        "recency_s",
        "frequency",
        "monetary",
        (3 - above(F.col("rb"), F.col("recency_s"))).cast("int").alias("r"),
        (1 + above(F.col("fb"), F.col("frequency"))).cast("int").alias("f"),
        (1 + above(F.col("mb"), F.col("monetary"))).cast("int").alias("m"),
    )
    return scored.select(
        "*",
        F.concat(
            F.col("r").cast("string"),
            F.col("f").cast("string"),
            F.col("m").cast("string"),
        ).alias("segment"),
    )


@register(
    "cusum_hourly_shift",
    oracle="""
WITH bounds AS (
  SELECT date_trunc('hour', MIN(ts)) AS lo, date_trunc('hour', MAX(ts)) AS hi FROM events
),
spine AS (
  SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS h FROM bounds
),
types AS (SELECT DISTINCT event_type FROM events),
agg AS (
  SELECT date_trunc('hour', ts) AS h, event_type, COUNT(*) AS x
  FROM events GROUP BY 1, 2
),
series AS (
  SELECT s.h, t.event_type, COALESCE(a.x, 0) AS x
  FROM spine s CROSS JOIN types t
  LEFT JOIN agg a ON a.h = s.h AND a.event_type = t.event_type
),
tot AS (
  SELECT event_type, COUNT(*) AS n, SUM(x) AS tx, SUM(x * x) AS txx
  FROM series GROUP BY event_type
),
dev AS (
  SELECT s.h, s.event_type, s.x, t.n, t.tx, t.txx,
         SUM(s.x * t.n - t.tx) OVER (PARTITION BY s.event_type ORDER BY s.h
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
  FROM series s JOIN tot t ON t.event_type = s.event_type
),
stat AS (
  SELECT h, event_type, x, n, tx, txx, cum,
         cum - MIN(cum) OVER (PARTITION BY event_type ORDER BY h
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS excess
  FROM dev
)
SELECT strftime(h, '%Y-%m-%d %H:%M:%S') AS hour, event_type,
       CAST(x AS BIGINT) AS x,
       CASE WHEN (n * txx - tx * tx) > 0
            THEN round(CAST(excess AS DOUBLE)
                       / sqrt(CAST(n * txx - tx * tx AS DOUBLE)), 6)
            ELSE 0.0 END AS cusum_z,
       CAST(CASE WHEN (n * txx - tx * tx) > 0
                  AND CAST(excess AS DOUBLE)
                      / sqrt(CAST(n * txx - tx * tx AS DOUBLE)) >= 5.0
            THEN 1 ELSE 0 END AS INT) AS is_shift
FROM stat
""",
)
def cusum_hourly_shift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM change-point detection over the hourly event-rate series,
    one monitor per event type.

    The reset-at-zero one-sided CUSUM ``S_t = max(0, S_{t-1} + (x_t - mu))``
    is a recursion no SQL window expresses directly, but it has an exact
    closed form: ``S_t = C_t - min_{t' <= t} C_{t'}`` where ``C`` is the
    plain cumulative sum of deviations — a cumsum plus a running min, both
    single-pass window frames.  Deviations are kept integer-exact by
    scaling with the per-type hour count (``x*n - T = n*(x - mu)``), so
    the entire recursion runs in BIGINT; the only float ops are the final
    normalization ``excess / sqrt(n*Sxx - Sx^2)`` (note ``n*sigma =
    sqrt(n*Sxx - Sx^2)`` exactly, so one integer discriminant feeds one
    sqrt) with an identical expression tree in the oracle, rounded to 6.
    A standardized excess >= 5 sigma flags a sustained rate shift.

    Scale: the series is pre-aggregated to |hours| x |types| rows before
    any window, so partition size is bounded by the time span, not the
    event count — same argument as ``anomaly_zscore_hourly``.  One
    shuffle on event_type drives cumsum, running min, and the per-type
    totals join (broadcast, |types| rows).
    """
    ev = load(spark, sf_dir, "events")
    bounds = ev.agg(
        F.date_trunc("hour", F.min("ts")).alias("lo"),
        F.date_trunc("hour", F.max("ts")).alias("hi"),
    )
    spine = bounds.select(
        F.explode(F.sequence("lo", "hi", F.expr("INTERVAL 1 HOUR"))).alias("h")
    )
    types = ev.select("event_type").distinct()
    agg = ev.groupBy(F.date_trunc("hour", F.col("ts")).alias("h"), "event_type").agg(
        F.count(F.lit(1)).alias("x")
    )
    series = (
        spine.crossJoin(F.broadcast(types))
        .join(agg, ["h", "event_type"], "left")
        .select("h", "event_type", F.coalesce("x", F.lit(0)).alias("x"))
    )
    tot = series.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("tx"),
        F.sum(F.col("x") * F.col("x")).alias("txx"),
    )
    run = (
        Window.partitionBy("event_type")
        .orderBy("h")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    dev = series.join(F.broadcast(tot), "event_type").select(
        "h",
        "event_type",
        "x",
        "n",
        "tx",
        "txx",
        F.sum(F.col("x") * F.col("n") - F.col("tx")).over(run).alias("cum"),
    )
    stat = dev.select(
        "*", (F.col("cum") - F.min("cum").over(run)).alias("excess")
    )
    disc = (F.col("n") * F.col("txx") - F.col("tx") * F.col("tx")).cast("double")
    z = F.col("excess").cast("double") / F.sqrt(disc)
    valid = F.col("n") * F.col("txx") - F.col("tx") * F.col("tx") > 0
    return stat.select(
        F.date_format("h", "yyyy-MM-dd HH:mm:ss").alias("hour"),
        "event_type",
        F.col("x").cast("bigint").alias("x"),
        F.when(valid, F.round(z, 6)).otherwise(F.lit(0.0)).alias("cusum_z"),
        F.when(valid & (z >= 5.0), 1).otherwise(0).cast("int").alias("is_shift"),
    )


# ---------------------------------------------------------------------------
# Seasonal-naive forecast backtest (the ops-forecasting baseline)
# ---------------------------------------------------------------------------
SEASON_DAYS = 7


@register(
    "seasonal_naive_forecast_error",
    oracle=f"""
WITH daily AS (
  SELECT date_trunc('day', ts) AS d, event_type, COUNT(*) AS n
  FROM events GROUP BY 1, 2
),
joined AS (
  SELECT a.event_type,
         a.n AS actual, b.n AS fcst,
         ABS(a.n - b.n) AS abs_err,
         ROUND(CAST(ABS(a.n - b.n) AS DOUBLE) / a.n, 6) AS ape
  FROM daily a
  JOIN daily b ON b.event_type = a.event_type
              AND b.d = a.d - INTERVAL {SEASON_DAYS} DAY
)
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n_days_scored,
       ROUND(CAST(SUM(abs_err) AS DOUBLE) / COUNT(*), 6) AS mae,
       ROUND(CAST(SUM(CAST(ape AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*), 6) AS mape,
       ROUND(CAST(SUM(actual - fcst) AS DOUBLE) / COUNT(*), 6) AS bias
FROM joined GROUP BY event_type
""",
)
def seasonal_naive_forecast_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Backtest of the seasonal-naive forecast (predict each day's event
    count with the count {SEASON_DAYS} days earlier) per event type:
    MAE, MAPE, and signed bias over every day with a same-weekday
    ancestor — the baseline every capacity/traffic forecasting system
    must beat, and the standing data-quality monitor for weekly
    seasonality drift.

    Exactness: counts are integers (MAE/bias sums exact); the one
    per-row ratio (APE) rounds to 6 before DECIMAL accumulation.

    Plan at 100 TB: one map-side-combinable daily rollup (metadata-sized
    result), a self-join of that tiny table on (type, day-{SEASON_DAYS})
    — the fact table is scanned once and never reshuffled."""
    ev = load(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.date_trunc("day", "ts").alias("d"), "event_type"
    ).agg(F.count(F.lit(1)).alias("n"))
    b = daily.select(
        F.col("event_type").alias("b_type"),
        F.col("d").alias("b_d"),
        F.col("n").alias("fcst"),
    )
    joined = daily.join(
        b,
        (F.col("event_type") == F.col("b_type"))
        & (F.col("b_d") == F.col("d") - F.expr(f"INTERVAL {SEASON_DAYS} DAY")),
    ).select(
        "event_type",
        F.col("n").alias("actual"),
        "fcst",
        F.abs(F.col("n") - F.col("fcst")).alias("abs_err"),
        # Tie-safety (r6 ask #2 audit): ape = int/int in DOUBLE, which CAN
        # land on an exact digit-7 tie (e.g. 1/128 = 0.0078125) — but both
        # engines compute the identical IEEE quotient and round the DOUBLE
        # path half-away-from-zero (verified on 0.0078125 → 0.007813 in
        # both), so ties resolve identically.  The ewma hazard was a
        # DECIMAL-typed product rounded under decimal semantics on one
        # side only; here neither engine rounds a decimal product.
        F.round(F.abs(F.col("n") - F.col("fcst")).cast("double") / F.col("n"), 6).alias(
            "ape"
        ),
    )
    return joined.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_days_scored"),
        F.round(F.sum("abs_err").cast("double") / F.count(F.lit(1)), 6).alias("mae"),
        F.round(dsum(F.col("ape")) / F.count(F.lit(1)), 6).alias("mape"),
        F.round(
            F.sum(F.col("actual") - F.col("fcst")).cast("double") / F.count(F.lit(1)), 6
        ).alias("bias"),
    )


# ---------------------------------------------------------------------------
# Exponentially-weighted moving average (closed form, exact weights)
# ---------------------------------------------------------------------------
# alpha = 1/2 exactly: every weight is a power of two.  That makes the
# per-term product y * 0.5^k BINARY-exact — which is precisely why a
# double ROUND(term, 6) is NOT cross-engine safe: y has 6 decimal
# digits and multiplying by 2^-k only shifts the binary exponent, so
# the product's decimal expansion can terminate in an exact digit-5 tie
# at the 7th place.  Spark's round (HALF_UP via BigDecimal) and
# DuckDB's double round resolve that tie differently (found at
# sf0.001: 371.548792 vs ...791).  Fix: compute each rounded term as an
# exact INTEGER via 0.5^k = 5^k/10^k —
#     term6 = (Y*5^k + half) div 10^k,  Y = y*10^6 (exact int),
#     half  = 5*10^(k-1)   (0 for k=0)
# which is HALF_UP by construction for the non-negative revenue values,
# then sum the integers (exact, order-free) and divide by 10^6 once.
# Both engines run the identical integer arithmetic => equal by
# construction.  Horizon cap: weights with k > EWMA_K_CAP are dropped
# in BOTH engines (inner join against the weights table), and the cap
# is PART OF THE OPERATOR'S DEFINITION — the reported ewma is the
# closed form truncated to the most recent EWMA_K_CAP+1 days.  The
# dropped tail is ABSOLUTE, not relative: it is bounded by
# y_max * 2^-EWMA_K_CAP (~y_max * 2.3e-10 at cap 32), so it exceeds
# the 5e-7 half-ulp of the 6-dp output only when daily sums pass
# ~2.1e3 — at any magnitude, parity holds because both engines drop
# the identical terms.  Cap sizing: 32 is the LARGEST cap whose
# products fit the stated 100 TB bound — Y = y*10^6 <= 1e15 gives
# Y*5^32 <= 2.4e37 < 1e38 (DECIMAL(38,0)) and < 1.7e38 (HUGEINT);
# k=33 would already overflow at Y=1e15.
EWMA_ALPHA_POW = 2  # alpha = 1 / EWMA_ALPHA_POW
EWMA_K_CAP = 32


def _ewma_weight_rows() -> list[tuple[int, int, int, int]]:
    """(k, 5^k, half=5*10^(k-1), 10^k) for k=0..EWMA_K_CAP, exact ints."""
    return [
        (k, 5**k, 0 if k == 0 else 5 * 10 ** (k - 1), 10**k)
        for k in range(EWMA_K_CAP + 1)
    ]


def _ewma_weights_sql() -> str:
    """DuckDB VALUES literal mirroring _ewma_weight_rows (HUGEINT-exact)."""
    rows = ", ".join(
        f"({k}, {p5}::HUGEINT, {half}::HUGEINT, {p10}::HUGEINT)"
        for k, p5, half, p10 in _ewma_weight_rows()
    )
    return f"weights (k, p5, half, p10) AS (VALUES {rows})"


@register(
    "ewma_daily_revenue",
    oracle=f"""
WITH daily AS (
  SELECT event_type, date_trunc('day', ts) AS d,
         ROUND(CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE), 6) AS y
  FROM events WHERE event_type = 'purchase' OR event_type = 'click'
  GROUP BY 1, 2
),
seq AS (
  SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY d) AS INT) AS t
  FROM daily
),
{_ewma_weights_sql()},
terms AS (
  SELECT a.event_type, a.d, a.t, a.y AS actual,
         (CAST(ROUND(b.y * 1000000, 0) AS HUGEINT) * w.p5 + w.half) // w.p10 AS term6
  FROM seq a
  JOIN seq b ON b.event_type = a.event_type AND b.t <= a.t
  JOIN weights w
    ON w.k = CASE WHEN b.t = 1 THEN a.t - 1 ELSE a.t - b.t + 1 END
)
SELECT event_type, strftime(d, '%Y-%m-%d') AS day, actual,
       ROUND(CAST(SUM(term6) AS DOUBLE) / 1000000, 6) AS ewma
FROM terms GROUP BY event_type, d, actual
""",
)
def ewma_daily_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially-weighted moving average of daily event value per
    event type (alpha = 1/2), via the CLOSED FORM rather than the
    recursion: S_t = y_1*0.5^(t-1) + sum_{k=2..t} y_k*0.5^(t-k+1).
    Each rounded term is computed as EXACT integer arithmetic
    (Y*5^k + half) div 10^k against a broadcast weights table of
    literal 5^k/10^k decimals (see module comment above EWMA_K_CAP for
    the tie-safety rationale) — no double rounding of binary-exact
    products anywhere in the plan.

    Plan at 100 TB: the fact table collapses to a |days| x |types|
    rollup first (map-side combinable); the triangular self-join runs
    on that metadata-sized table only, against a 33-row broadcast
    weights table — the closed form trades an unparallelizable
    recursion for a tiny T^2 join, the right trade whenever T is
    calendar-bounded."""
    import decimal

    from pyspark.sql.types import (
        DecimalType,
        IntegerType,
        StructField,
        StructType,
    )

    ev = load(spark, sf_dir, "events").filter(
        F.col("event_type").isin("purchase", "click")
    )
    daily = ev.groupBy(
        "event_type", F.date_trunc("day", "ts").alias("d")
    ).agg(F.round(dsum(F.col("value")), 6).alias("y"))
    seq = daily.withColumn(
        "t",
        F.row_number()
        .over(Window.partitionBy("event_type").orderBy("d"))
        .cast("int"),
    )
    b = seq.select(
        F.col("event_type").alias("b_type"),
        F.col("t").alias("b_t"),
        F.col("y").alias("b_y"),
    )
    wschema = StructType(
        [
            StructField("k", IntegerType()),
            StructField("p5", DecimalType(25, 0)),  # 5^32 has 23 digits
            StructField("half", DecimalType(35, 0)),  # 5*10^31 has 32 digits
            StructField("p10", DecimalType(35, 0)),  # 10^32 has 33 digits
        ]
    )
    weights = spark.createDataFrame(
        [
            (k, decimal.Decimal(p5), decimal.Decimal(half), decimal.Decimal(p10))
            for k, p5, half, p10 in _ewma_weight_rows()
        ],
        wschema,
    )
    terms = (
        seq.join(
            b,
            (F.col("b_type") == F.col("event_type"))
            & (F.col("b_t") <= F.col("t")),
        )
        .withColumn(
            "k",
            F.when(F.col("b_t") == 1, F.col("t") - 1).otherwise(
                F.col("t") - F.col("b_t") + 1
            ),
        )
        .join(F.broadcast(weights), "k")
        .select(
            "event_type",
            "d",
            F.col("y").alias("actual"),
            F.expr(
                "(CAST(ROUND(b_y * 1000000, 0) AS DECIMAL(18,0)) * p5 + half)"
                " div p10"
            ).alias("term6"),
        )
    )
    return terms.groupBy(
        "event_type", "d", "actual"
    ).agg(
        F.round(F.sum("term6").cast("double") / F.lit(1000000), 6).alias("ewma")
    ).select(
        "event_type",
        F.date_format("d", "yyyy-MM-dd").alias("day"),
        "actual",
        "ewma",
    )


# ---------------------------------------------------------------------------
# Autocorrelation function of the daily event-count series
# ---------------------------------------------------------------------------
ACF_MAX_LAG = 7


@register(
    "acf_daily_events",
    oracle=f"""
WITH daily AS (
  SELECT date_trunc('day', ts) AS d, COUNT(*) AS n FROM events GROUP BY 1
),
seq AS (SELECT n, CAST(ROW_NUMBER() OVER (ORDER BY d) AS INT) AS t FROM daily),
lags AS (SELECT unnest(range(1, {ACF_MAX_LAG + 1})) AS lag),
pairs AS (
  SELECT l.lag, a.n AS x, b.n AS y
  FROM lags l JOIN seq a ON TRUE JOIN seq b ON b.t = a.t + l.lag
),
sums AS (
  SELECT lag, COUNT(*) AS cnt,
         SUM(x) AS sx, SUM(y) AS sy, SUM(x * y) AS sxy,
         SUM(x * x) AS sxx, SUM(y * y) AS syy
  FROM pairs GROUP BY lag
)
SELECT CAST(lag AS INT) AS lag, CAST(cnt AS BIGINT) AS n_pairs,
       ROUND((CAST(cnt AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
             / sqrt((CAST(cnt AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
                    * (CAST(cnt AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy)), 6)
         AS acf
FROM sums
""",
)
def acf_daily_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Autocorrelation function of the daily event-count series at lags
    1..{ACF_MAX_LAG} — the seasonality detector that justifies (or
    refutes) the day-7 seasonal-naive forecaster: a weekly cycle shows
    as an ACF spike at lag 7.  Pearson correlation of the series with
    its lag over aligned pairs; all moment sums are INTEGER (counts), so
    both engines agree exactly until the single final division.

    Plan at 100 TB: the fact scan collapses to one |days|-row rollup;
    lag alignment is a self-join of that tiny table exploded by
    {ACF_MAX_LAG} lags.  Nothing downstream of the first aggregate
    scales with data volume."""
    ev = load(spark, sf_dir, "events")
    daily = ev.groupBy(F.date_trunc("day", "ts").alias("d")).agg(
        F.count(F.lit(1)).alias("n")
    )
    seq = daily.select(
        "n", F.row_number().over(Window.orderBy("d")).cast("int").alias("t")
    )
    lags = spark.range(1, ACF_MAX_LAG + 1).select(F.col("id").cast("int").alias("lag"))
    b = seq.select(F.col("n").alias("y"), F.col("t").alias("b_t"))
    pairs = (
        lags.crossJoin(seq)
        .join(b, F.col("b_t") == F.col("t") + F.col("lag"))
        .select("lag", F.col("n").alias("x"), "y")
    )
    sums = pairs.groupBy("lag").agg(
        F.count(F.lit(1)).alias("cnt"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    cnt_d = F.col("cnt").cast("double")
    num = cnt_d * F.col("sxy") - F.col("sx").cast("double") * F.col("sy")
    denx = cnt_d * F.col("sxx") - F.col("sx").cast("double") * F.col("sx")
    deny = cnt_d * F.col("syy") - F.col("sy").cast("double") * F.col("sy")
    return sums.select(
        "lag",
        F.col("cnt").alias("n_pairs"),
        F.round(num / F.sqrt(denx * deny), 6).alias("acf"),
    )


# ---------------------------------------------------------------------------
# Longest consecutive-active-day streak per user (gaps and islands)
# ---------------------------------------------------------------------------
@register(
    "user_active_day_streaks",
    oracle="""
WITH active AS (
  SELECT DISTINCT user_id, CAST(date_trunc('day', ts) AS DATE) AS d FROM events
),
grp AS (
  SELECT user_id, d,
         d - CAST(ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY d) AS INT) AS g
  FROM active
),
streaks AS (
  SELECT user_id, g, COUNT(*) AS len FROM grp GROUP BY user_id, g
),
best AS (SELECT user_id, MAX(len) AS max_streak FROM streaks GROUP BY user_id)
SELECT CAST(max_streak AS INT) AS streak_len,
       CAST(COUNT(*) AS BIGINT) AS n_users
FROM best GROUP BY max_streak
""",
)
def user_active_day_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution of each user's LONGEST consecutive-active-day streak
    — the classic gaps-and-islands computation (day minus dense row
    number is constant within a run), the engagement statistic behind
    every retention dashboard.  Pure integer/date arithmetic.

    Plan at 100 TB: one shuffle to (user, day) distinct, one per-user
    window sweep (no self-join), two metadata-sized aggregations.  The
    window partition is a user's ACTIVE-DAY count — calendar-bounded,
    never skewed by event volume."""
    ev = load(spark, sf_dir, "events")
    active = ev.select(
        "user_id", F.to_date(F.date_trunc("day", "ts")).alias("d")
    ).distinct()
    g = F.date_sub(
        F.col("d"),
        F.row_number().over(Window.partitionBy("user_id").orderBy("d")),
    )
    streaks = (
        active.withColumn("g", g)
        .groupBy("user_id", "g")
        .agg(F.count(F.lit(1)).alias("len"))
    )
    best = streaks.groupBy("user_id").agg(F.max("len").alias("max_streak"))
    return best.groupBy(F.col("max_streak").cast("int").alias("streak_len")).agg(
        F.count(F.lit(1)).alias("n_users")
    )
