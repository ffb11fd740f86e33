"""Sketch & reconciliation operators — the mergeable-summary layer every
100 TB deployment needs.

Two families:

- **HLL sketches** (Apache DataSketches via Spark's native
  ``hll_sketch_agg`` / ``hll_union_agg`` / ``hll_sketch_estimate``):
  distinct counts whose partial states are *mergeable* — build one sketch
  per partition/day/source, union them for any rollup, never rescan the
  raw data.  ``approx_count_distinct`` (HyperLogLog++) answers one query;
  a stored sketch answers every future rollup.  Approximate by nature →
  rows-only registration, with tolerance + merge-equality pytests
  (``tests/test_sketches.py``).

- **Block checksums**: cross-engine table reconciliation (the "did the
  migration copy every row" audit) without moving data: per-row md5 over a
  canonical serialization, folded into an order-independent per-block SUM.
  Blocks shard the table so a mismatch localizes to ~1/NB of the data.
  Exact and engine-neutral (md5 + decimal sums) → fully oracle-checked.

The reference has no analytics layer at all (SURVEY §2.2 — no aggregation
anywhere; ``scripts/spiders/web_spider_oo.py`` counts nothing); these
derive from the 100 TB north-star, not a reference behavior.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..checkpointing import materialize
from ..registry import register
from ..sources.tables import load, load_spread

# ---------------------------------------------------------------------------
# HLL sketches: mergeable distinct counts
# ---------------------------------------------------------------------------

# lgConfigK=14 → 16 Ki registers, ~0.8% relative standard error; fixed so
# sketches built by different jobs/rounds stay union-compatible.
_LG_K = 14


def hll_by_group(df: DataFrame, group_col: str, value_col: str) -> DataFrame:
    """Per-group HLL sketches (binary, storable) — one shuffle, map-side
    partial sketches merged by the final aggregation."""
    return df.groupBy(group_col).agg(
        F.hll_sketch_agg(value_col, F.lit(_LG_K)).alias("sketch")
    )


# DataSketches HLL relative standard error at lg_k = 14; the bounded
# contracts allow 3x the estimator's rse (plus 2 absolute for integer
# granularity).  ONE slack policy shared by every sketch contract
# (approx_distinct_users passes HLL++'s rsd) so the bound can't fork.
_HLL_RSE = 1.04 / (2 ** (_LG_K / 2))


def hll_contract_slack(exact_col, rse: float = _HLL_RSE):
    return F.greatest(
        F.lit(3 * rse) * exact_col.cast("double"), F.lit(2.0)
    )


_hll_slack = hll_contract_slack  # internal alias


@register(
    "hll_distinct_by_type",
    oracle="""
WITH typed AS (
  SELECT event_type, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_users
  FROM events GROUP BY event_type
),
allrow AS (
  SELECT '__all__' AS event_type,
         CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_users
  FROM events
)
SELECT event_type, exact_users, TRUE AS within_bound FROM typed
UNION ALL
SELECT event_type, exact_users, TRUE AS within_bound FROM allrow
""",
)
def hll_distinct_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate distinct users per event type, plus an ``__all__`` row
    whose estimate comes from UNIONING the per-type sketches — not from
    rescanning events.

    That re-aggregation is the entire point of sketches at 100 TB: store
    per-partition (here per-type) sketches once, answer any coarser
    rollup by merging kilobyte summaries.  The merged estimate is
    bit-identical to a direct global sketch (DataSketches HLL union is a
    deterministic per-register max) — asserted in tests/test_sketches.py.

    Bounded-contract oracle: the sketch estimate is engine-specific, so
    the emitted columns are the exact distinct count and
    ``within_bound`` — TRUE iff the estimate (including the MERGED
    ``__all__`` estimate, so the union path itself is under contract)
    lies within max(3·rse, 2) of exact, rse = 1.04/√2^lg_k ≈ 0.81%."""
    from ..checkpointing import materialize

    ev = load(spark, sf_dir, "events")
    # checkpoint: the sketch table feeds BOTH the typed estimates and the
    # merged __all__ union — unmaterialized, Catalyst would run the
    # sketch-building aggregate twice (and the bounded contract adds the
    # exact legs on top)
    per_type = materialize(hll_by_group(ev, "event_type", "user_id"))
    typed = per_type.select(
        "event_type", F.hll_sketch_estimate("sketch").alias("approx_users")
    )
    merged = per_type.agg(F.hll_union_agg("sketch").alias("sketch")).select(
        F.lit("__all__").alias("event_type"),
        F.hll_sketch_estimate("sketch").alias("approx_users"),
    )
    est = typed.unionByName(merged)
    exact = (
        ev.groupBy("event_type")
        .agg(F.countDistinct("user_id").cast("bigint").alias("exact_users"))
        .unionByName(
            ev.agg(
                F.countDistinct("user_id").cast("bigint").alias("exact_users")
            ).select(F.lit("__all__").alias("event_type"), "exact_users")
        )
    )
    # COALESCE: on an empty events table the merged __all__ sketch is a
    # union over zero rows → NULL estimate; the contract must read that as
    # "estimates 0" (TRUE iff exact is 0 too), not propagate NULL where
    # the oracle emits TRUE (r9 self-review).
    est_val = F.coalesce(F.col("approx_users").cast("double"), F.lit(0.0))
    return exact.join(est, "event_type").select(
        "event_type",
        "exact_users",
        (
            F.abs(est_val - F.col("exact_users"))
            <= _hll_slack(F.col("exact_users"))
        ).alias("within_bound"),
    )


@register(
    "approx_topk_words",
    oracle="""
WITH c AS (
  SELECT word, CAST(COUNT(*) AS BIGINT) AS n
  FROM (SELECT unnest(list_filter(string_split(lower(text), ' '), w -> w <> ''))
          AS word
        FROM documents) t
  GROUP BY word
)
SELECT word, n, TRUE AS within_bound
FROM c ORDER BY n DESC, word LIMIT 20
""",
)
def approx_topk_words(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 corpus words by an ``approx_top_k`` frequency sketch.

    The exact twin (``salted_topk_words``, operators/extensions.py) pays a
    full shuffle of every distinct word; the sketch tracks a bounded set of
    counters per partition and merges them — constant state per task no
    matter how large the vocabulary, the right trade at 100 TB when only
    the head matters.  ``maxItemsTracked`` = 10⁴ bounds per-task memory.

    Bounded-contract oracle: output rows are the EXACT top-20 under a
    deterministic tie-break (count DESC, word ASC — a TakeOrdered top-k,
    no global sort), and ``within_bound`` is TRUE iff the sketch also
    surfaced that word with a count within 1% (heads ≪ maxItemsTracked
    are exact in practice) — OR the word sits on the rank-20 count tie
    boundary, where the sketch may legitimately surface an equal-count
    twin instead.  A sketch regression (missed head word, drifted count)
    flips within_bound and fails the value hash."""
    from pyspark.sql import Window

    words = (
        load_spread(spark, sf_dir, "documents")  # tokenize is compute-bound
        # split on the literal separator the oracle uses (string_split ' '),
        # not \s+ — regex-vs-literal tokenizer drift diverges the engines on
        # any non-space whitespace (r9 self-review)
        .select(F.explode(F.split(F.lower(F.col("text")), " ")).alias("word"))
        .filter(F.col("word") != "")
    )
    exact_top = (
        words.groupBy("word")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
        .orderBy(F.col("n").desc(), "word")
        .limit(20)
    )
    sk = (
        words.agg(F.expr("approx_top_k(word, 20, 10000)").alias("top"))
        .select(F.explode("top").alias("e"))
        .select(F.col("e.item").alias("word"), F.col("e.count").alias("sk_n"))
    )
    # min over the 20-row top — metadata-sized unpartitioned window.
    boundary_n = F.min("n").over(Window.partitionBy())
    close = F.col("sk_n").isNotNull() & (
        F.abs(F.col("sk_n").cast("double") - F.col("n"))
        <= F.lit(0.01) * F.col("n").cast("double")
    )
    return exact_top.join(sk, "word", "left").select(
        "word",
        "n",
        (close | (F.col("n") == boundary_n)).alias("within_bound"),
    )


# ---------------------------------------------------------------------------
# Block checksums: cross-engine reconciliation
# ---------------------------------------------------------------------------

_N_BLOCKS = 32


@register(
    "block_checksum_orders",
    oracle=f"""
SELECT o_orderkey % {_N_BLOCKS} AS block,
       COUNT(*) AS n_rows,
       CAST(SUM(CAST(CAST('0x' || substr(md5(concat_ws('|',
                CAST(o_orderkey AS VARCHAR),
                CAST(o_custkey AS VARCHAR),
                o_orderstatus,
                CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS VARCHAR),
                CAST(epoch_us(o_orderdate) AS VARCHAR),
                o_orderpriority)), 1, 8) AS BIGINT) AS DECIMAL(20,0)))
            AS VARCHAR) AS checksum
FROM orders
GROUP BY o_orderkey % {_N_BLOCKS}
""",
)
def block_checksum_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-independent per-block checksum of the orders table.

    Reconciling two 100 TB copies (post-migration audit, replica drift
    detection) must not ship rows anywhere: each side computes NB small
    (block, n_rows, checksum) summaries locally and compares those.  The
    construction is engine-neutral so ANY engine can sit on either side —
    exactly what the oracle check proves, DuckDB being "the other engine":

    - canonical row serialization: '|' -joined strings with explicit,
      render-stable casts (DECIMAL(18,2) for the price — double→string
      rendering differs across engines; epoch-µs integers for the
      timestamp — datetime formatting differs across engines);
    - md5 over the serialization, first 8 hex chars parsed as a 32-bit
      integer (both engines parse hex exactly);
    - SUM in DECIMAL — commutative/associative, so shuffle order,
      partitioning, and aggregation-tree shape can't change the result,
      and 38 digits cannot overflow (2^32 · 10^10 rows < 10^20).

    One map-side-combined shuffle of NB·(3 numbers); a mismatch rescans
    only the offending block's 1/NB of the table.
    """
    orders = load(spark, sf_dir, "orders")
    row_hash = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat_ws(
                        "|",
                        F.col("o_orderkey").cast("string"),
                        F.col("o_custkey").cast("string"),
                        F.col("o_orderstatus"),
                        F.col("o_totalprice").cast("decimal(18,2)").cast("string"),
                        F.unix_micros(F.col("o_orderdate").cast("timestamp")).cast("string"),
                        F.col("o_orderpriority"),
                    )
                ),
                1,
                8,
            ),
            16,
            10,
        )
        .cast("decimal(20,0)")
    )
    return (
        orders.select((F.col("o_orderkey") % _N_BLOCKS).alias("block"), row_hash.alias("h"))
        .groupBy("block")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            # VARCHAR on both engines: DECIMAL(38,0) exceeds int64 and
            # cannot round-trip a pandas fetch losslessly (driver-red r4).
            F.sum("h").cast("decimal(38,0)").cast("string").alias("checksum"),
        )
    )


@register(
    "hll_rolling_7d_users",
    oracle="""
WITH du AS (
  SELECT DISTINCT CAST(date_trunc('day', ts) AS DATE) AS day, user_id
  FROM events
),
days AS (SELECT DISTINCT day FROM du),
t AS (
  SELECT d.day, u.user_id
  FROM days d JOIN du u
    ON u.day BETWEEN d.day - INTERVAL 6 DAY AND d.day
)
SELECT strftime(day, '%Y-%m-%d') AS day,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_users_7d,
       TRUE AS within_bound
FROM t GROUP BY day ORDER BY day
""",
)
def hll_rolling_7d_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-7-day distinct users per day, answered by UNIONING the
    stored per-day sketches in a window frame — the query exact COUNT
    DISTINCT fundamentally cannot do incrementally, because distinct
    counts don't add: yesterday's rolling count tells you nothing about
    today's without re-scanning 7 days of raw events.  Day-sketches make
    the rolling distinct a frame-union over kilobyte state.

    Scale: the raw scan aggregates once into |days| sketch rows
    (map-side combined); the window then runs over a metadata-sized
    table, so the frame's ORDER BY costs nothing at any corpus size.

    Bounded-contract oracle: the emitted columns are the EXACT trailing
    count plus ``within_bound`` (estimate within max(3·rse, 2) of
    exact).  The exact twin is itself scale-shaped: per-(day, user)
    distinct pairs fan out to their ≤7 target days (a 7x map-side
    explode of the already-deduped pair table — no range join, no
    re-scan of raw events), then one count-distinct per target day,
    filtered to observed days."""
    from pyspark.sql import Window

    ev = load(spark, sf_dir, "events")
    daily = (
        ev.groupBy(F.date_trunc("day", F.col("ts")).alias("day"))
        .agg(F.hll_sketch_agg("user_id", F.lit(_LG_K)).alias("sk"))
        .withColumn("epoch_day", F.unix_date(F.col("day").cast("date")))
    )
    # RANGE over epoch days, not ROWS over observed days: a day with zero
    # events must not stretch "trailing 7 calendar days" to older sketches.
    w = Window.orderBy("epoch_day").rangeBetween(-6, 0)
    est = daily.select(
        F.col("epoch_day"),
        F.hll_sketch_estimate(F.hll_union_agg("sk").over(w)).alias(
            "approx_users_7d"
        ),
    )
    # materialized: du feeds BOTH the 7-day explode and the observed-day
    # list — unmaterialized, the events scan + distinct shuffle run twice
    du = materialize(
        ev.select(
            F.unix_date(F.date_trunc("day", F.col("ts")).cast("date")).alias("d"),
            "user_id",
        ).distinct()
    )
    exact = (
        du.select(
            F.explode(F.sequence(F.col("d"), F.col("d") + 6)).alias("epoch_day"),
            "user_id",
        )
        .join(du.select(F.col("d").alias("epoch_day")).distinct(), "epoch_day")
        .groupBy("epoch_day")
        .agg(F.countDistinct("user_id").cast("bigint").alias("exact_users_7d"))
    )
    return exact.join(est, "epoch_day").select(
        F.date_format(F.date_from_unix_date("epoch_day"), "yyyy-MM-dd").alias(
            "day"
        ),
        "exact_users_7d",
        (
            F.abs(
                F.col("approx_users_7d").cast("double")
                - F.col("exact_users_7d")
            )
            <= _hll_slack(F.col("exact_users_7d"))
        ).alias("within_bound"),
    )


# ---------------------------------------------------------------------------
# Count-Min sketch: mergeable approximate frequencies with one-sided error
# ---------------------------------------------------------------------------
CM_DEPTH = 4
CM_WIDTH = 512
CM_PROBE_TOPK = 10

# Deterministic row-d hash: first 8 md5 hex nibbles of "word#d" mod width —
# identical arithmetic in Spark (conv) and DuckDB (0x-prefix cast).
_CM_BUCKET_SQL = (
    "CAST(('0x' || substr(md5(word || '#' || CAST({d} AS VARCHAR)), 1, 8)) "
    f"AS BIGINT) % {CM_WIDTH}"
)


def _cm_bucket(word, d: int):
    return (
        F.conv(
            F.substring(F.md5(F.concat(word, F.lit(f"#{d}"))), 1, 8), 16, 10
        ).cast("long")
        % CM_WIDTH
    )


@register(
    "countmin_word_freq",
    oracle=f"""
WITH w2 AS (
  SELECT unnest(string_split(text, ' ')) AS word FROM documents
),
words AS (SELECT word FROM w2 WHERE word <> ''),
truec AS (SELECT word, COUNT(*) AS true_count FROM words GROUP BY word),
top AS (SELECT word, true_count FROM truec
        ORDER BY true_count DESC, word LIMIT {CM_PROBE_TOPK}),
cells AS (
  SELECT g.d, {_CM_BUCKET_SQL.format(d="g.d")} AS bucket, COUNT(*) AS c
  FROM words CROSS JOIN (SELECT unnest(range(0, {CM_DEPTH})) AS d) g
  GROUP BY 1, 2
),
est AS (
  SELECT t.word, t.true_count, MIN(c.c) AS cm_estimate
  FROM top t
  CROSS JOIN (SELECT unnest(range(0, {CM_DEPTH})) AS d) g
  JOIN cells c ON c.d = g.d
   AND c.bucket = CAST(('0x' || substr(md5(t.word || '#' ||
                        CAST(g.d AS VARCHAR)), 1, 8)) AS BIGINT) % {CM_WIDTH}
  GROUP BY 1, 2
)
SELECT word, CAST(true_count AS BIGINT) AS true_count,
       CAST(cm_estimate AS BIGINT) AS cm_estimate,
       CAST(cm_estimate - true_count AS BIGINT) AS overcount
FROM est
""",
)
def countmin_word_freq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Min sketch over the corpus word stream ({CM_DEPTH}×{CM_WIDTH}
    cells), probed for the exact top-{CM_PROBE_TOPK} words: estimate =
    min over rows of the hashed bucket's count, never under the true
    frequency (one-sided error) — the frequency twin of the HLL family.

    The sketch is the point at 100 TB: {CM_DEPTH}·{CM_WIDTH} = 2 Ki
    counters summarize ANY stream size, partial sketches from different
    shards/days merge by cell-wise addition (the groupBy here IS that
    merge), and a frequency probe touches {CM_DEPTH} broadcast cells
    instead of rescanning the corpus.  Hashes are fixed md5-derived
    integers, so the whole construction — unlike a seeded library sketch
    — is engine-exact and fully oracle-checked (the overcount column is
    real sketch error, identical in both engines).

    Plan: one exploded word scan feeds both the exact top-k (for the
    probe set) and the {CM_DEPTH}-way cell aggregate; cells and probe
    rows are metadata-sized, every join below the scan is broadcast."""
    words = materialize(
        load_spread(spark, sf_dir, "documents")
        .select(F.explode(F.split("text", " ")).alias("word"))
        .filter(F.col("word") != "")
    )
    top = (
        words.groupBy("word")
        .agg(F.count(F.lit(1)).alias("true_count"))
        .orderBy(F.desc("true_count"), "word")
        .limit(CM_PROBE_TOPK)
    )
    cells = None
    for d in range(CM_DEPTH):
        part = words.select(
            F.lit(d).alias("d"), _cm_bucket(F.col("word"), d).alias("bucket")
        )
        cells = part if cells is None else cells.unionAll(part)
    cells = cells.groupBy("d", "bucket").agg(F.count(F.lit(1)).alias("c"))
    probes = None
    for d in range(CM_DEPTH):
        p = top.select(
            "word",
            "true_count",
            F.lit(d).alias("d"),
            _cm_bucket(F.col("word"), d).alias("bucket"),
        )
        probes = p if probes is None else probes.unionAll(p)
    return (
        probes.join(cells, ["d", "bucket"])
        .groupBy("word", "true_count")
        .agg(F.min("c").alias("cm_estimate"))
        .select(
            "word",
            "true_count",
            "cm_estimate",
            (F.col("cm_estimate") - F.col("true_count")).alias("overcount"),
        )
    )


# ---------------------------------------------------------------------------
# Bloom-filter join prefilter: shrink the big side before it shuffles
# ---------------------------------------------------------------------------
BLOOM_M = 8192
BLOOM_K = 3
BLOOM_NATION = 1

_BLOOM_POS_SQL = (
    "CAST(('0x' || substr(md5(CAST({key} AS VARCHAR) || ':' "
    f"|| CAST({{i}} AS VARCHAR)), 1, 8)) AS BIGINT) % {BLOOM_M}"
)


def _bloom_pos(key, i: int):
    return (
        F.conv(
            F.substring(
                F.md5(F.concat(key.cast("string"), F.lit(f":{i}"))), 1, 8
            ),
            16,
            10,
        ).cast("long")
        % BLOOM_M
    )


@register(
    "bloom_prefilter_join",
    oracle=f"""
WITH keys AS (
  SELECT c_custkey AS k FROM customer WHERE c_nationkey = {BLOOM_NATION}
),
bits AS (
  SELECT DISTINCT {_BLOOM_POS_SQL.format(key="k", i="g.i")} AS b
  FROM keys CROSS JOIN (SELECT unnest(range(0, {BLOOM_K})) AS i) g
),
passed AS (
  SELECT o_orderkey, o_custkey FROM orders
  WHERE {_BLOOM_POS_SQL.format(key="o_custkey", i="0")} IN (SELECT b FROM bits)
    AND {_BLOOM_POS_SQL.format(key="o_custkey", i="1")} IN (SELECT b FROM bits)
    AND {_BLOOM_POS_SQL.format(key="o_custkey", i="2")} IN (SELECT b FROM bits)
)
SELECT (SELECT COUNT(*) FROM orders) AS n_orders,
       (SELECT COUNT(*) FROM passed) AS n_pass_bloom,
       (SELECT COUNT(*) FROM passed WHERE o_custkey IN (SELECT k FROM keys))
         AS n_true_match,
       (SELECT COUNT(*) FROM passed WHERE o_custkey NOT IN (SELECT k FROM keys))
         AS n_false_pos
""",
)
def bloom_prefilter_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter join prefilter: build an m={BLOOM_M}, k={BLOOM_K}
    Bloom filter over the small side's join keys (customers of one
    nation) and drop big-side rows MAP-SIDE before any shuffle or join
    — the runtime-filter pattern (Spark AQE calls it an
    InSubqueryExec/bloom runtime filter) made explicit and measurable:
    the query reports exactly how many rows the filter passed and how
    many were false positives (no false negatives, by construction).

    At 100 TB this is the difference between shuffling the whole fact
    table and shuffling ~|matching| rows: the bit set is kilobytes,
    broadcast to every scan task; the membership tests are {BLOOM_K}
    hash+lookups per row, fully inside codegen (md5/conv/array — no
    Python).  Hashes are md5-derived so both engines build the
    identical filter and agree on every false positive.

    Plan: small-side distinct-bit aggregate (≤{BLOOM_M} rows) collapses
    to one broadcast array; the fact scan filters with array_contains;
    the exact verify is a broadcast semi/anti join of the SURVIVORS
    only."""
    cust = load(spark, sf_dir, "customer").filter(
        F.col("c_nationkey") == BLOOM_NATION
    )
    keys = cust.select(F.col("c_custkey").alias("k"))
    bits_rows = None
    for i in range(BLOOM_K):
        p = keys.select(_bloom_pos(F.col("k"), i).alias("b"))
        bits_rows = p if bits_rows is None else bits_rows.unionAll(p)
    bloom = bits_rows.distinct().agg(F.collect_set("b").alias("bits"))
    orders = load_spread(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    # single fact scan: flag every row (bloom pass + exact membership via
    # one broadcast left join) and reduce all four counts in one aggregate
    probed = orders.crossJoin(F.broadcast(bloom)).join(
        F.broadcast(keys.withColumn("_m", F.lit(1))),
        F.col("o_custkey") == F.col("k"),
        "left",
    )
    passes = (
        F.array_contains("bits", _bloom_pos(F.col("o_custkey"), 0))
        & F.array_contains("bits", _bloom_pos(F.col("o_custkey"), 1))
        & F.array_contains("bits", _bloom_pos(F.col("o_custkey"), 2))
    )
    is_true = F.col("_m").isNotNull()
    return probed.agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(passes.cast("long")).alias("n_pass_bloom"),
        F.sum((passes & is_true).cast("long")).alias("n_true_match"),
        F.sum((passes & ~is_true).cast("long")).alias("n_false_pos"),
    )


# ---------------------------------------------------------------------------
# HLL audience overlap: intersection by inclusion-exclusion over sketches
# ---------------------------------------------------------------------------
@register(
    "hll_intersection_estimate",
    oracle="""
WITH tu AS (
  SELECT DISTINCT event_type, user_id FROM events
),
per_type AS (
  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n FROM tu GROUP BY event_type
),
inter AS (
  SELECT a.event_type AS type_a, b.event_type AS type_b,
         CAST(COUNT(*) AS BIGINT) AS exact_inter
  FROM tu a JOIN tu b ON a.user_id = b.user_id AND a.event_type < b.event_type
  GROUP BY 1, 2
)
SELECT i.type_a, i.type_b,
       pa.n AS exact_a, pb.n AS exact_b,
       pa.n + pb.n - i.exact_inter AS exact_union,
       i.exact_inter,
       TRUE AS within_bound
FROM inter i
JOIN per_type pa ON pa.event_type = i.type_a
JOIN per_type pb ON pb.event_type = i.type_b
ORDER BY type_a, type_b
""",
)
def hll_intersection_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audience overlap from SKETCHES: for every unordered pair of event
    types, estimate the user intersection by inclusion–exclusion over
    HLL sketches — est(A) + est(B) − est(A ∪ B), the union computed by
    MERGING the two stored kilobyte sketches, never rescanning events.
    This is the sketch workflow behind every "how many users did both X
    and Y" dashboard at 100 TB: per-segment sketches are built once;
    any pairwise (or k-way) overlap is answered from sketch algebra.

    Bounded contract (the r5 pattern): sketch estimates are
    engine-specific, so the emitted columns are the EXACT set sizes and
    ``within_bound`` — TRUE iff the inclusion–exclusion estimate lands
    within the compounded slack of the three sketches it differences
    (shared ``hll_contract_slack`` policy applied to |A|+|B|+|A∪B|; the
    intersection inherits the absolute error of all three terms, the
    published caveat of sketch differencing — unlike union, HLL
    intersection is NOT relatively accurate when the overlap is small).

    Plan at 100 TB: one distinct (type, user) projection feeds both
    legs; sketches group to |alphabet| rows and pair-merge |alphabet|²/2
    kilobyte objects; the exact legs are a user-keyed self-join whose
    per-user fan-out is bounded by the type alphabet.  Everything after
    the two shuffles is metadata-sized."""
    from ..checkpointing import materialize

    ev = load(spark, sf_dir, "events")
    tu = materialize(ev.select("event_type", "user_id").distinct())
    sk = materialize(hll_by_group(tu, "event_type", "user_id"))
    pairs = (
        sk.alias("a")
        .join(sk.alias("b"), F.col("a.event_type") < F.col("b.event_type"))
        .select(
            F.col("a.event_type").alias("type_a"),
            F.col("b.event_type").alias("type_b"),
            F.hll_sketch_estimate(F.col("a.sketch")).alias("est_a"),
            F.hll_sketch_estimate(F.col("b.sketch")).alias("est_b"),
            F.hll_sketch_estimate(
                F.hll_union(F.col("a.sketch"), F.col("b.sketch"))
            ).alias("est_union"),
        )
    )
    per_type = tu.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    inter = (
        tu.alias("x")
        .join(
            tu.alias("y"),
            (F.col("x.user_id") == F.col("y.user_id"))
            & (F.col("x.event_type") < F.col("y.event_type")),
        )
        .groupBy(
            F.col("x.event_type").alias("type_a"),
            F.col("y.event_type").alias("type_b"),
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("exact_inter"))
    )
    exact = (
        inter.join(
            per_type.select(
                F.col("event_type").alias("type_a"), F.col("n").alias("exact_a")
            ),
            "type_a",
        )
        .join(
            per_type.select(
                F.col("event_type").alias("type_b"), F.col("n").alias("exact_b")
            ),
            "type_b",
        )
        .select(
            "type_a",
            "type_b",
            "exact_a",
            "exact_b",
            (F.col("exact_a") + F.col("exact_b") - F.col("exact_inter"))
            .cast("bigint")
            .alias("exact_union"),
            "exact_inter",
        )
    )
    est_inter = F.col("est_a") + F.col("est_b") - F.col("est_union")
    return (
        exact.join(pairs, ["type_a", "type_b"])
        .select(
            "type_a",
            "type_b",
            "exact_a",
            "exact_b",
            "exact_union",
            "exact_inter",
            (
                F.abs(est_inter - F.col("exact_inter"))
                <= _hll_slack(
                    F.col("exact_a") + F.col("exact_b") + F.col("exact_union")
                )
            ).alias("within_bound"),
        )
        .orderBy("type_a", "type_b")
    )
