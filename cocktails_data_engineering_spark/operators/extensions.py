"""Engine extensions beyond the reference's surface: the operators the
build brief names that Spark lacks natively — as-of join, range join —
plus the scale techniques (skew salting, deterministic sampling) every
100 TB pipeline leans on.  Each is built as a composition of DataFrame
ops (brief's option (a)) — no UDFs — and each is DuckDB-oracle-checked.

Timestamps are compared as epoch MICROSECONDS (bigint) everywhere: the
fixture stores ns, Spark's native resolution is µs, so both engines
truncate to µs before any comparison or output (no format-string pitfalls,
no ns-vs-µs tie surprises).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import register
from ..sources.tables import load

# epoch-µs of the (ns-precision) oracle timestamp
_US = "(epoch_ns({col}) // 1000)"


# ---------------------------------------------------------------------------
# As-of join (merge-style, no per-row subquery)
# ---------------------------------------------------------------------------
@register(
    "asof_join_last_signup",
    oracle=f"""
SELECT p.event_id, p.user_id,
       {_US.format(col='p.ts')} AS purchase_us,
       (SELECT MAX({_US.format(col='s.ts')})
        FROM events s
        WHERE s.user_id = p.user_id AND s.event_type = 'signup'
          AND {_US.format(col='s.ts')} <= {_US.format(col='p.ts')}) AS last_signup_us
FROM events p
WHERE p.event_type = 'purchase'
""",
)
def asof_join_last_signup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: for every purchase, the most recent signup of the same
    user at-or-before it.

    Spark has no ASOF JOIN; the scalable formulation is the union-merge:
    interleave both streams sorted by (user, time) and carry the last
    signup time forward with an ignoreNulls window ``last`` — one shuffle
    on user_id, linear scan per partition, no per-row probe.  (The oracle
    uses the equivalent correlated MAX subquery.)  Signups sort before
    purchases at equal timestamps so the join is inclusive.
    """
    ev = load(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", F.unix_micros("ts").alias("us")
    )
    signups = ev.filter(F.col("event_type") == "signup").select(
        "user_id",
        F.col("us"),
        F.lit(0).alias("kind"),
        F.col("us").alias("s_us"),
        F.lit(None).cast("long").alias("event_id"),
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("us"),
        F.lit(1).alias("kind"),
        F.lit(None).cast("long").alias("s_us"),
        "event_id",
    )
    merged = signups.unionByName(purchases)
    w = (
        Window.partitionBy("user_id")
        .orderBy("us", "kind")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        merged.withColumn("last_signup_us", F.last("s_us", ignorenulls=True).over(w))
        .filter(F.col("kind") == 1)
        .select(
            "event_id",
            "user_id",
            F.col("us").alias("purchase_us"),
            "last_signup_us",
        )
    )


# ---------------------------------------------------------------------------
# Range (interval) join via time-bucketing
# ---------------------------------------------------------------------------
RANGE_US = 300 * 1_000_000  # 5 minutes


@register(
    "range_join_recent_activity",
    oracle=f"""
SELECT e.event_id, e.user_id,
       (SELECT COUNT(*)
        FROM events a
        WHERE a.user_id = e.user_id
          AND {_US.format(col='a.ts')} >= {_US.format(col='e.ts')} - {RANGE_US}
          AND {_US.format(col='a.ts')} <  {_US.format(col='e.ts')}) AS n_recent
FROM events e
WHERE e.event_type = 'error'
""",
)
def range_join_recent_activity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range join: per error event, how many same-user events happened in
    the 5 minutes before it.

    The naive plan (equi-join on user + range filter) is a per-user
    cartesian product — quadratic in events-per-user.  The scale shape
    used here buckets time into range-width windows and joins each error
    to its own and the previous bucket only: every qualifying pair is in
    one of those two buckets, and join fan-out is bounded by bucket
    population, not user history length.
    """
    ev = load(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", F.unix_micros("ts").alias("us")
    )
    activity = ev.select(
        "user_id", F.col("us").alias("a_us"), (F.col("us") / RANGE_US).cast("long").alias("bucket")
    )
    errors = ev.filter(F.col("event_type") == "error").select(
        "event_id", "user_id", F.col("us").alias("e_us"),
        (F.col("us") / RANGE_US).cast("long").alias("bucket"),
    )
    probe = errors.select(
        "event_id", "user_id", "e_us",
        F.explode(F.array(F.col("bucket") - 1, F.col("bucket"))).alias("bucket"),
    )
    counts = (
        probe.join(activity, ["user_id", "bucket"])
        .filter(
            (F.col("a_us") >= F.col("e_us") - RANGE_US) & (F.col("a_us") < F.col("e_us"))
        )
        .groupBy("event_id")
        .agg(F.count(F.lit(1)).alias("n_recent"))
    )
    return (
        errors.join(counts, "event_id", "left")
        .select(
            "event_id",
            "user_id",
            F.coalesce("n_recent", F.lit(0)).alias("n_recent"),
        )
    )


# ---------------------------------------------------------------------------
# Skew-salted aggregation (two-phase)
# ---------------------------------------------------------------------------
N_SALTS = 16
TOPK_WORDS = 20


@register(
    "salted_topk_words",
    oracle=f"""
SELECT word, COUNT(*) AS n
FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents) t
WHERE word <> ''
GROUP BY word
ORDER BY n DESC, word
LIMIT {TOPK_WORDS}
""",
)
def salted_topk_words(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k word count via explicit two-phase salting: aggregate on
    (word, salt) first — {N_SALTS}-way splitting any hot key across
    reducers — then combine partials per word.

    Identical result to the direct groupBy (the oracle IS the unsalted
    SQL); the point is the plan: when one key holds 10% of 100 TB, the
    salted first phase keeps every reducer bounded.  AQE's skew handling
    covers joins; salting is the aggregation-side counterpart.
    """
    docs = load(spark, sf_dir, "documents")
    words = (
        docs.select("doc_id", F.explode(F.split("text", " ")).alias("word"))
        .filter(F.col("word") != "")
        .withColumn("salt", (F.col("doc_id") % N_SALTS).cast("int"))
    )
    partial = words.groupBy("word", "salt").agg(F.count(F.lit(1)).alias("pn"))
    return (
        partial.groupBy("word")
        .agg(F.sum("pn").alias("n"))
        .orderBy(F.col("n").desc(), "word")
        .limit(TOPK_WORDS)
    )


# ---------------------------------------------------------------------------
# Deterministic hash split (train/test sampling)
# ---------------------------------------------------------------------------
_HEX = "0123456789abcdef"

# first hex nibble of md5 of the stringified doc_id, 0..15
_ORACLE_NIBBLE = f"(strpos('{_HEX}', substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1)"


@register(
    "train_test_split_stats",
    oracle=f"""
SELECT CASE WHEN {_ORACLE_NIBBLE} < 13 THEN 'train' ELSE 'test' END AS split,
       lang,
       COUNT(*) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS total_chars
FROM documents
GROUP BY 1, 2
ORDER BY split, lang
""",
)
def train_test_split_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic ~81/19 train/test split by content-independent hash
    of the document id (md5 nibble < 13), with per-split per-language
    profile — the reproducible sampling every training pipeline needs
    (same row → same split on any cluster, any partitioning, any run).
    """
    docs = load(spark, sf_dir, "documents")
    nibble = F.instr(
        F.lit(_HEX), F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1)
    ) - 1
    split = F.when(nibble < 13, "train").otherwise("test")
    return (
        docs.select(split.alias("split"), "lang", "n_chars")
        .groupBy("split", "lang")
        .agg(F.count(F.lit(1)).alias("n_docs"), F.sum("n_chars").alias("total_chars"))
        .orderBy("split", "lang")
    )


# ---------------------------------------------------------------------------
# Skew-salted equi-join (replicate-the-dim)
# ---------------------------------------------------------------------------
def salted_equi_join(
    fact: DataFrame,
    dim: DataFrame,
    key: str,
    fact_salt: F.Column,
    n_salts: int = N_SALTS,
) -> DataFrame:
    """Equi-join where the FACT side is salted and the DIM side is
    replicated ×``n_salts``: rows of a hot key spread across ``n_salts``
    reducers instead of landing on one.

    ``fact_salt`` must be a deterministic 0..n_salts-1 expression over
    fact columns (e.g. ``pmod(hash(event_id), n_salts)``) so results are
    reproducible.  Result set is IDENTICAL to the plain join — only the
    partitioning changes.  Use when one key holds a disproportionate
    share of the fact and the dim is too big to broadcast (a broadcast
    join needs no salt; AQE skew-split handles moderate cases — explicit
    salting is the heavy-skew fallback that works on any Spark).
    """
    salted_fact = fact.withColumn("_salt", fact_salt.cast("int"))
    salts = F.array(*[F.lit(s) for s in range(n_salts)])
    salted_dim = dim.withColumn("_salt", F.explode(salts))
    return salted_fact.join(salted_dim, [key, "_salt"]).drop("_salt")


@register(
    "salted_join_event_enrich",
    oracle="""
SELECT e.event_id, e.user_id, u.n_user_events
FROM events e
JOIN (SELECT user_id, COUNT(*) AS n_user_events FROM events GROUP BY user_id) u
  ON u.user_id = e.user_id
WHERE e.event_type = 'error'
""",
)
def salted_join_event_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Error events enriched with each user's total activity through the
    salted join: fact salt = pmod(hash(event_id), N_SALTS) (deterministic
    per row), per-user dim replicated ×N_SALTS.  Oracle is the UNSALTED
    SQL join — proving salting changes the shuffle layout, never the
    result."""
    ev = load(spark, sf_dir, "events")
    dim = ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("n_user_events"))
    errors = ev.filter(F.col("event_type") == "error").select("event_id", "user_id")
    salt = F.pmod(F.hash("event_id"), F.lit(N_SALTS))
    return salted_equi_join(errors, dim, "user_id", salt).select(
        "event_id", "user_id", "n_user_events"
    )


# Shared CTE chain: the deletion-neighborhood ED-1 pair list (used by
# fuzzy_join_ed1 and entity_resolution_clusters).
_FUZZY_PAIRS_CTES = """toks AS (
  SELECT DISTINCT w || '_' || CAST(doc_id % 30 AS VARCHAR) AS token
  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents)
  WHERE w <> ''
),
variants AS (
  SELECT token,
         CASE WHEN i = 0 THEN token
              ELSE substr(token, 1, i - 1) || substr(token, i + 1) END AS variant
  FROM toks CROSS JOIN unnest(range(0, length(token) + 1)) t(i)
),
cand AS (
  SELECT DISTINCT a.token AS token_a, b.token AS token_b
  FROM variants a JOIN variants b
    ON a.variant = b.variant AND a.token < b.token
),
ed1 AS (SELECT token_a, token_b FROM cand
        WHERE levenshtein(token_a, token_b) = 1)"""


@register(
    "fuzzy_join_ed1",
    oracle=f"""
WITH {_FUZZY_PAIRS_CTES}
SELECT token_a, token_b FROM ed1
""",
)
def fuzzy_join_ed1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy self-join at edit distance 1 via deletion-neighborhood
    blocking: two strings are within one edit iff they share a deletion
    variant (the string itself, or the string with one char removed), so
    candidates come from an EQUI-join on the variant key and
    ``levenshtein`` runs only on candidates — the typo-mining /
    entity-resolution member of the candidates→verify family, never the
    N² levenshtein cross join.

    Fixture domain: distinct word_suffix tokens synthesized from the
    documents vocabulary (~900 tokens) so real ED-1 pairs exist.
    Scale: |variants| = Σ (len+1) per token; bucket sizes are bounded by
    alphabet statistics, and the verify cost is |candidates|, not N²."""
    docs = load(spark, sf_dir, "documents")
    toks = (
        docs.select(
            F.explode(F.split("text", " ")).alias("w"),
            (F.col("doc_id") % 30).cast("string").alias("sfx"),
        )
        .filter(F.col("w") != "")
        .select(F.concat("w", F.lit("_"), "sfx").alias("token"))
        .distinct()
    )
    variants = (
        toks.select(
            "token", F.explode(F.sequence(F.lit(0), F.length("token"))).alias("i")
        )
        .select(
            "token",
            F.when(F.col("i") == 0, F.col("token"))
            .otherwise(
                F.concat(
                    F.substring(F.col("token"), F.lit(1), F.col("i") - 1),
                    F.substring(F.col("token"), F.col("i") + 1, F.lit(1 << 30)),
                )
            )
            .alias("variant"),
        )
    )
    a = variants.select(F.col("token").alias("token_a"), "variant")
    b = variants.select(F.col("token").alias("token_b"), "variant")
    cand = (
        a.join(b, "variant")
        .filter(F.col("token_a") < F.col("token_b"))
        .select("token_a", "token_b")
        .distinct()
    )
    return cand.filter(F.levenshtein("token_a", "token_b") == 1)


@register(
    "entity_resolution_clusters",
    oracle=f"""
WITH RECURSIVE {_FUZZY_PAIRS_CTES},
edges AS (SELECT token_a AS u, token_b AS v FROM ed1
          UNION SELECT token_b, token_a FROM ed1),
reach(node, r) AS (
  SELECT u, u FROM (SELECT DISTINCT u FROM edges) t
  UNION
  SELECT reach.node, e.v FROM reach JOIN edges e ON e.u = reach.r
),
labels AS (SELECT node, MIN(r) AS cluster_id FROM reach GROUP BY node)
SELECT cluster_id, COUNT(*) AS n_members
FROM labels GROUP BY cluster_id
""",
)
def entity_resolution_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composed flagship #5 — entity resolution: ED-1 fuzzy matches
    (deletion-neighborhood blocking, fuzzy_join_ed1) become edges, and
    connected components merge transitively-matching name variants into
    entities; the lexicographically smallest variant is the entity id.
    The master-data-management shape: dedup.connected_components'
    min-label loop works unchanged on string keys.

    Plan: the fuzzy pair list materializes once (CC consumes it twice for
    the symmetric union); the CC loop is O(component diameter) rounds —
    variant families are stars around the base form, so diameter ≈ 2."""
    from .dedup import connected_components

    pairs = fuzzy_join_ed1(spark, sf_dir).select(
        F.col("token_a").alias("doc_a"), F.col("token_b").alias("doc_b")
    )
    cc = connected_components(pairs)
    return cc.groupBy("cluster_id").agg(F.count(F.lit(1)).alias("n_members"))


# ---------------------------------------------------------------------------
# Sorted-neighborhood blocking (the other classic ER candidate generator)
# ---------------------------------------------------------------------------
_SN_WINDOW = 2  # compare each token with its next 2 sorted neighbors
_SN_MAX_ED = 2

# same token domain as fuzzy_join_ed1 (the _FUZZY_PAIRS_CTES toks CTE)
_SN_TOKS = """
  SELECT DISTINCT w || '_' || CAST(doc_id % 30 AS VARCHAR) AS token
  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents)
  WHERE w <> ''
"""


@register(
    "sorted_neighborhood_pairs",
    oracle=f"""
WITH toks AS ({_SN_TOKS}),
nb AS (
  SELECT token,
         lead(token, 1) OVER (PARTITION BY substr(token, 1, 1) ORDER BY token) AS n1,
         lead(token, 2) OVER (PARTITION BY substr(token, 1, 1) ORDER BY token) AS n2
  FROM toks
),
pairs AS (
  SELECT token AS token_a, n1 AS token_b FROM nb WHERE n1 IS NOT NULL
  UNION ALL
  SELECT token AS token_a, n2 AS token_b FROM nb WHERE n2 IS NOT NULL
)
SELECT token_a, token_b, CAST(levenshtein(token_a, token_b) AS INT) AS ed
FROM pairs
WHERE levenshtein(token_a, token_b) <= {_SN_MAX_ED}
""",
)
def sorted_neighborhood_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sorted-neighborhood blocking: sort the key domain, compare each
    token only with its next {_SN_WINDOW} sorted neighbors, verify with
    edit distance ≤ {_SN_MAX_ED}.  The OTHER classic entity-resolution
    candidate generator beside deletion-neighborhood hashing
    (fuzzy_join_ed1): deletion variants catch any single edit anywhere,
    sorted neighbors catch longer shared-prefix families — production ER
    runs both and unions the candidate sets.

    Plan at 100 TB: the sort is PARTITIONED by the token's first
    character (the standard multi-pass SN trick), so each partition
    sorts independently — no global window, no single-reducer sort; the
    candidate count is exactly {_SN_WINDOW}·|tokens| and the verify cost
    is linear, never N²."""
    docs = load(spark, sf_dir, "documents")
    toks = (
        docs.select(
            F.explode(F.split("text", " ")).alias("w"),
            (F.col("doc_id") % 30).cast("string").alias("sfx"),
        )
        .filter(F.col("w") != "")
        .select(F.concat("w", F.lit("_"), "sfx").alias("token"))
        .distinct()
    )
    w = Window.partitionBy(F.substring("token", 1, 1)).orderBy("token")
    nb = toks.select(
        "token",
        F.lead("token", 1).over(w).alias("n1"),
        F.lead("token", 2).over(w).alias("n2"),
    )
    pairs = (
        nb.filter(F.col("n1").isNotNull()).select(
            F.col("token").alias("token_a"), F.col("n1").alias("token_b")
        )
    ).unionAll(
        nb.filter(F.col("n2").isNotNull()).select(
            F.col("token").alias("token_a"), F.col("n2").alias("token_b")
        )
    )
    ed = F.levenshtein("token_a", "token_b")
    return pairs.select("token_a", "token_b", ed.alias("ed")).filter(
        F.col("ed") <= _SN_MAX_ED
    )


# ---------------------------------------------------------------------------
# PassJoin: edit-distance <= 2 similarity self-join via segment blocking
# ---------------------------------------------------------------------------
PASSJOIN_TAU = 2  # supported edit-distance threshold (segments = TAU + 1)
PASSJOIN_MOD = 97  # token-suffix modulus: prime, so suffixes spread 0..96


def _passjoin_seg(l, i):
    """Start position (1-based) and length of segment ``i`` (1..3) in the
    even 3-way partition of a string of length ``l`` (short segments
    first — the classic PassJoin layout)."""
    base = F.floor(l / 3).cast("int")
    rem = l % 3
    seg_len = base + F.when(i > 3 - rem, 1).otherwise(0)
    seg_start = 1 + (i - 1) * base + F.greatest(F.lit(0), (i - 1) - (3 - rem))
    return seg_start, seg_len


@register(
    "passjoin_ed2_words",
    oracle=f"""
WITH toks AS (
  SELECT DISTINCT w || '_' || CAST(doc_id % {PASSJOIN_MOD} AS VARCHAR) AS token
  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents)
  WHERE w <> ''
)
SELECT a.token AS token_a, b.token AS token_b,
       CAST(levenshtein(a.token, b.token) AS INT) AS dist
FROM toks a JOIN toks b
  ON a.token < b.token
 AND abs(length(a.token) - length(b.token)) <= {PASSJOIN_TAU}
 AND levenshtein(a.token, b.token) <= {PASSJOIN_TAU}
""",
)
def passjoin_ed2_words(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edit-distance <= 2 similarity self-join via PassJoin segment
    blocking — the tau=2 big sibling of ``fuzzy_join_ed1`` (whose
    deletion neighborhood only reaches tau=1).

    Pigeonhole: split every string into tau+1 = 3 segments; at most 2
    edits can touch at most 2 segments, so any pair within distance 2
    shares one segment EXACTLY, and that segment's position in the
    partner shifts by at most +/-2.  Candidates therefore come from an
    EQUI-join: the probe side emits its own 3 (segment, index, length)
    keys; the index side emits substrings cut at the PARTNER geometry —
    every length l in [len-2, len+2], each segment position shifted by
    delta in [-2, 2] — bounded at 75 keys per string.  Exact
    ``levenshtein`` then verifies candidates only.  The oracle is the
    definitional all-pairs join (length-banded), so a match proves the
    blocking is lossless, not just plausible.

    Scale: index size is O(75 N) rows of short strings; bucket width is
    governed by segment-value frequencies (same knob as the MinHash
    band-bucket cap) and the verify cost is |candidates|, never N^2 —
    no CartesianProduct in the plan (contract test).

    Fixture domain: the documents vocabulary suffixed with doc_id %
    {PASSJOIN_MOD} (~3k distinct tokens), so real distance-1/2 pairs
    exist across both word stems and numeric suffixes.
    """
    docs = load(spark, sf_dir, "documents")
    toks = (
        docs.select(
            F.explode(F.split("text", " ")).alias("w"),
            (F.col("doc_id") % PASSJOIN_MOD).cast("string").alias("sfx"),
        )
        .filter(F.col("w") != "")
        .select(F.concat("w", F.lit("_"), "sfx").alias("token"))
        .distinct()
        .withColumn("len", F.length("token"))
    )
    three = F.explode(F.array(F.lit(1), F.lit(2), F.lit(3))).alias("i")
    p_start, p_len = _passjoin_seg(F.col("len"), F.col("i"))
    probe = toks.select("token", "len", three).select(
        F.col("token").alias("token_a"),
        F.col("len").alias("l"),
        "i",
        F.substring("token", p_start, p_len).alias("seg"),
    )
    idx = (
        toks.select("token", "len", three)
        .select(
            "token",
            "len",
            "i",
            F.explode(
                F.sequence(F.col("len") - PASSJOIN_TAU, F.col("len") + PASSJOIN_TAU)
            ).alias("l"),
        )
        .select(
            "token",
            "len",
            "i",
            "l",
            F.explode(
                F.sequence(F.lit(-PASSJOIN_TAU), F.lit(PASSJOIN_TAU))
            ).alias("delta"),
        )
    )
    i_start, i_len = _passjoin_seg(F.col("l"), F.col("i"))
    start = i_start + F.col("delta")
    idx = idx.filter(
        (i_len >= 1) & (start >= 1) & (start + i_len - 1 <= F.col("len"))
    ).select(
        F.col("token").alias("token_b"),
        "i",
        "l",
        F.substring("token", start, i_len).alias("seg"),
    )
    cand = (
        probe.join(idx, ["seg", "i", "l"])
        .filter(F.col("token_a") < F.col("token_b"))
        .select("token_a", "token_b")
        .distinct()
    )
    dist = F.levenshtein("token_a", "token_b")
    return cand.filter(dist <= PASSJOIN_TAU).select(
        "token_a", "token_b", dist.cast("int").alias("dist")
    )
