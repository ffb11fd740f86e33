"""Crawl/fetch layer (SURVEY.md §2.1 O1-O4, O7) — the reference's source
side, re-expressed for Spark.

The reference fetches live pages single-threaded with politeness sleeps
and a retry policy (``scripts/spiders/web_spider_oo.py:228-249`` fetch,
``:140-156`` session construction, ``:158-170`` retry policy) and parses
hrefs with BeautifulSoup (``:251-263``).  Here:

- **Transport is injectable** — tests and the driver's correctness gate
  never touch a network.  :class:`SyntheticSiteTransport` serves a
  deterministic site derived from the ``documents`` table, so a DuckDB
  oracle can replicate the whole crawl in SQL.
- **Fetch runs inside ``mapInPandas``** — one transport (≈ one HTTP
  session, O2) per partition, a retry loop with exponential backoff (O3)
  around each GET, an optional politeness sleep (O1) between requests.
  Input is repartitioned by domain first so per-domain rate limits hold
  no matter how many executors run: all of a domain's URLs land in one
  partition.  Fetch output is non-deterministic in the real world, so
  callers must persist/checkpoint it before branching plans — the
  pipeline below does exactly that via an eager ``localCheckpoint``.
- **Link extraction is an Arrow-batched pandas UDF** (the one genuinely
  UDF-shaped operator in the reference): ``Series.str.findall`` over the
  html, returned as ``array<string>`` and exploded.  Cheap status/type
  filters are applied *upstream* of the UDF by construction — Catalyst
  does not reorder around Python UDFs (SURVEY §4).

Scale: fetch cost is politeness-bound, not compute-bound — the win over
the reference is per-domain parallelism (D domains crawl D× faster, each
still polite).  Everything after the fetch is columnar Catalyst code.
"""

from __future__ import annotations

import re
import time
from collections.abc import Callable, Iterator
from dataclasses import dataclass

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

from ..functions import linkops
from ..checkpointing import materialize
from ..registry import register
from ..sources.tables import load, load_spread

ROOT_SITE = "http://site.test/"
SITE_MOD = 500  # links always target doc_id 0..499 — present at every sf

HREF_RE = re.compile(r'href="([^"]*)"')


# ---------------------------------------------------------------------------
# The deterministic synthetic site (Spark exprs + Python + SQL twins)
# ---------------------------------------------------------------------------
def _status_for(doc_id: int, attempt: int) -> int:
    """404 for %17 pages; 503 on the FIRST attempt for %19 pages (retry
    succeeds); 200 otherwise."""
    if doc_id % 17 == 0:
        return 404
    if doc_id % 19 == 0 and attempt == 0:
        return 503
    return 200


def _html_for(doc_id: int) -> str:
    a = (7 * doc_id + 1) % SITE_MOD
    b = (7 * doc_id + 2) % SITE_MOD
    return (
        f'<html><body><a href="/p{a}">one</a> <a href="/p{b}">two</a> '
        f'<a href="/careers/c{doc_id}">blocked</a> '
        f'<a href="http://other.test/o{doc_id}">abs</a> '
        "<a>nohref</a></body></html>"
    )


# SQL twins of the derivations above (used by every oracle below).
_SQL_URL = f"'{ROOT_SITE}p' || CAST(doc_id AS VARCHAR)"
_SQL_STATUS = "CASE WHEN doc_id % 17 = 0 THEN 404 ELSE 200 END"  # post-retry view
_SQL_HTML = (
    f"'<html><body><a href=\"/p' || CAST((7*doc_id+1) % {SITE_MOD} AS VARCHAR) || "
    f"'\">one</a> <a href=\"/p' || CAST((7*doc_id+2) % {SITE_MOD} AS VARCHAR) || "
    "'\">two</a> <a href=\"/careers/c' || CAST(doc_id AS VARCHAR) || "
    "'\">blocked</a> <a href=\"http://other.test/o' || CAST(doc_id AS VARCHAR) || "
    "'\">abs</a> <a>nohref</a></body></html>'"
)


def pages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The synthetic site as a batch table: (doc_id, url, status_code, html).

    Status here is the POST-retry view (503s resolved) — the fetch path
    below derives the same table through the transport + retry machinery.
    """
    docs = load(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.concat(F.lit(f"{ROOT_SITE}p"), F.col("doc_id").cast("string")).alias("url"),
        F.when(F.col("doc_id") % 17 == 0, F.lit(404)).otherwise(F.lit(200)).alias(
            "status_code"
        ),
    ).withColumn(
        "html",
        F.concat(
            F.lit('<html><body><a href="/p'),
            ((F.col("doc_id") * 7 + 1) % SITE_MOD).cast("string"),
            F.lit('">one</a> <a href="/p'),
            ((F.col("doc_id") * 7 + 2) % SITE_MOD).cast("string"),
            F.lit('">two</a> <a href="/careers/c'),
            F.col("doc_id").cast("string"),
            F.lit('">blocked</a> <a href="http://other.test/o'),
            F.col("doc_id").cast("string"),
            F.lit('">abs</a> <a>nohref</a></body></html>'),
        ),
    )


# ---------------------------------------------------------------------------
# O1-O3: transport + per-partition fetch
# ---------------------------------------------------------------------------
@dataclass(frozen=True)
class FetchResult:
    status: int
    body: str


class SyntheticSiteTransport:
    """Deterministic fake of the reference's requests.Session: serves the
    synthetic site, returning 503 on the first attempt for %19 pages so
    the retry policy is actually exercised."""

    def __init__(self) -> None:
        self._attempts: dict[str, int] = {}

    def get(self, url: str) -> FetchResult:
        doc_id = int(url.rsplit("/p", 1)[1])
        attempt = self._attempts.get(url, 0)
        self._attempts[url] = attempt + 1
        status = _status_for(doc_id, attempt)
        body = _html_for(doc_id) if status == 200 else ""
        return FetchResult(status=status, body=body)


RETRY_STATUSES = frozenset({500, 502, 503, 504})  # web_spider_oo.py:162
MAX_RETRIES = 5  # web_spider_oo.py:159

FETCH_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("status_code", T.IntegerType()),
        T.StructField("html", T.StringType()),
    ]
)


def politeness_delay_rng(seed: int, partition_id: int) -> "random.Random":
    """Seeded per-partition RNG for politeness jitter: deterministic for a
    given (seed, partition), independent across partitions — so tests can
    reproduce draws while a 1000-task fetch stage doesn't sleep in
    lockstep."""
    import random

    return random.Random(f"{seed}|{partition_id}")


def fetch_pages(
    urls: DataFrame,
    transport_factory: Callable[[], object] = SyntheticSiteTransport,
    delay_s: float = 0.0,
    delay_range_s: "tuple[float, float] | None" = None,
    backoff_s: float = 0.0,
    jitter_seed: int = 0,
) -> DataFrame:
    """Fetch every ``url`` through an injectable transport (O1-O3).

    One transport per partition (session construction, O2); retry with
    exponential backoff on 5xx (O3); politeness sleep between requests
    (O1).  The reference draws a fresh ``randint(40, 90)`` seconds per
    request (web_spider_oo.py:231-232,246) — pass
    ``delay_range_s=(40, 90)`` for that behavior (uniform draw from a
    seeded per-partition RNG, so runs are reproducible); ``delay_s``
    keeps the fixed-delay form.  Tests pass 0/None.  Callers should
    first ``repartition(n, domain)`` so per-domain politeness holds
    cluster-wide; :func:`crawl_edges` does.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pyspark import TaskContext

        ctx = TaskContext.get()
        rng = politeness_delay_rng(jitter_seed, ctx.partitionId() if ctx else 0)
        transport = transport_factory()
        first = True
        for pdf in batches:
            rows = []
            for url in pdf["url"]:
                if not first:
                    if delay_range_s is not None:
                        time.sleep(rng.uniform(*delay_range_s))
                    elif delay_s:
                        time.sleep(delay_s)
                first = False
                result = transport.get(url)
                for attempt in range(1, MAX_RETRIES + 1):
                    if result.status not in RETRY_STATUSES:
                        break
                    if backoff_s:
                        time.sleep(backoff_s * (2 ** (attempt - 1)))
                    result = transport.get(url)
                rows.append((url, result.status, result.body))
            yield pd.DataFrame(rows, columns=["url", "status_code", "html"])

    return urls.mapInPandas(run, schema=FETCH_SCHEMA)


# ---------------------------------------------------------------------------
# O7: link extraction as an Arrow-batched pandas UDF
# ---------------------------------------------------------------------------
@pandas_udf(T.ArrayType(T.StringType()))
def extract_hrefs(html: pd.Series) -> pd.Series:
    """All href values of ``<a>`` tags, in document order (the BeautifulSoup
    collect at web_spider_oo.py:251-263, vectorized)."""
    return html.fillna("").str.findall(HREF_RE)


# ---------------------------------------------------------------------------
# Registered queries
# ---------------------------------------------------------------------------
@register(
    "filter_status",
    oracle=f"""
SELECT doc_id, {_SQL_URL} AS url, {_SQL_STATUS} AS status_code
FROM documents
WHERE {_SQL_STATUS} = 200
""",
)
def filter_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Status gate (O4, web_spider_oo.py:104-105): keep 200s only."""
    return pages(spark, sf_dir).filter(F.col("status_code") == 200).select(
        "doc_id", "url", "status_code"
    )


@register(
    "extract_links_udf",
    oracle=f"""
WITH site AS (SELECT doc_id, {_SQL_URL} AS url, {_SQL_HTML} AS html FROM documents)
SELECT url, unnest(regexp_extract_all(html, 'href="([^"]*)"', 1)) AS href
FROM site
""",
)
def extract_links_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O7 as a pandas UDF: html → array<string> of hrefs → explode.

    The only Python in the crawl's transform layer; Arrow-batched, and
    fed already-filtered rows (UDF fencing — cheap predicates run before
    the UDF by construction).
    """
    site = pages(spark, sf_dir)
    return site.select("url", F.explode(extract_hrefs(F.col("html"))).alias("href"))


@register(
    "extract_links_sql",
    oracle=f"""
WITH site AS (SELECT doc_id, {_SQL_URL} AS url, {_SQL_HTML} AS html FROM documents)
SELECT url, unnest(regexp_extract_all(html, 'href="([^"]*)"', 1)) AS href
FROM site
""",
)
def extract_links_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O7 without Python: ``regexp_extract_all`` inside whole-stage
    codegen — same rows as extract_links_udf (oracle-identical), no Arrow
    hop, no Python workers.

    This is the 100 TB default; the pandas-UDF variant remains for pages
    needing a real HTML parser (entity decoding, malformed markup) where
    a regex genuinely can't go — swap is one operator, plan unchanged.
    """
    site = pages(spark, sf_dir)
    return site.select(
        "url",
        F.explode(
            F.expr(r"""regexp_extract_all(html, 'href="([^"]*)"', 1)""")
        ).alias("href"),
    )


@register(
    "crawl_pipeline_e2e",
    oracle=f"""
WITH ok AS (SELECT doc_id, {_SQL_URL} AS url FROM documents WHERE {_SQL_STATUS} = 200)
SELECT DISTINCT url AS parent_link,
       '{ROOT_SITE}p' || CAST((7*doc_id + k) % {SITE_MOD} AS VARCHAR) AS child_link
FROM ok, (SELECT unnest([1, 2]) AS k)
""",
)
def crawl_pipeline_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end crawl of the synthetic site through the REAL machinery:
    per-domain repartition → mapInPandas fetch (retry resolves the 503s)
    → status filter → pandas-UDF extraction → blocklist filter →
    relative-only rewrite → distinct edge list.

    The oracle derives the surviving edges arithmetically: %17 pages 404
    out; of each page's 5 hrefs the two ``/p…`` links survive (blocklist
    kills ``/careers/…``, the absolute link is dropped by the
    relative-only rule, the hrefless anchor never extracts).
    """
    urls = pages(spark, sf_dir).select("url")
    # Per-domain politeness partitioning: one domain → one partition.
    urls = urls.repartition(8, F.expr("parse_url(url, 'HOST')"))
    fetched = fetch_pages(urls).transform(materialize)  # fence non-determinism
    ok = fetched.filter(F.col("status_code") == 200)
    links = ok.select(
        F.col("url").alias("parent_link"),
        F.explode(extract_hrefs(F.col("html"))).alias("href"),
    )
    return (
        links.filter(linkops.keep_link(F.col("href")) & linkops.is_relative(F.col("href")))
        .select(
            "parent_link",
            linkops.resolve_relative(F.col("href"), ROOT_SITE).alias("child_link"),
        )
        .distinct()
    )


# ---------------------------------------------------------------------------
# The full spider run (O14 + O5 + O12 end-to-end): BFS crawl from a root
# producing the reference's two output tables — `indexing` edges and
# `unique_links` vertices (web_spider_oo.py:91-138).
# ---------------------------------------------------------------------------
CRAWL_DEPTH = 2  # reference pen_depth ∈ {1,2,4}; 2 exercises the loop fully

# Recursive min-depth walk over the synthetic site, expanding only through
# 200-status pages; shared by both spider-run oracles.
_SQL_WALK = f"""
site AS (
  SELECT doc_id, {_SQL_URL} AS url, {_SQL_STATUS} AS status
  FROM documents
),
walk(doc_id, depth) AS (
  SELECT CAST(1 AS BIGINT), 0
  UNION ALL
  SELECT (7 * w.doc_id + ks.k) % {SITE_MOD}, w.depth + 1
  FROM walk w
  JOIN site p ON p.doc_id = w.doc_id AND p.status = 200
  CROSS JOIN (SELECT unnest([1, 2]) AS k) ks
  WHERE w.depth < {CRAWL_DEPTH}
),
mindepth AS (SELECT doc_id, MIN(depth) AS depth FROM walk GROUP BY doc_id)
"""


def _spider_run(spark: SparkSession, sf_dir: str) -> tuple[DataFrame, DataFrame]:
    """Level-synchronous crawl from ``{ROOT}p1`` through the REAL fetch +
    extract + clean machinery, faithful to run_spider's semantics:

    - visited-set dedup before fetch (O5): a URL is attempted once, at its
      minimum depth;
    - non-200 pages are recorded but never expanded (O4);
    - edges are per-page (SURVEY quirk Q1: docstring semantics);
    - the final vertex set includes the last frontier's unvisited children
      (quirk Q4, replicated deliberately);
    - per-round eager localCheckpoint fences the non-deterministic fetch
      and truncates the iterative lineage (O14's loop done Spark-style).

    Returns (edges(pen_depth, parent_link, child_link), unique_links(url)).
    """
    # Root p1: a 200-status page (p0 is one of the synthetic 404s).
    root = spark.createDataFrame([(f"{ROOT_SITE}p1",)], "url string")
    frontier = root
    visited = spark.createDataFrame([], "url string")
    edge_frames = []

    for depth in range(CRAWL_DEPTH):
        frontier = frontier.join(visited, "url", "left_anti").transform(materialize)
        visited = visited.union(frontier).transform(materialize)
        fetched = fetch_pages(frontier).transform(materialize)
        ok = fetched.filter(F.col("status_code") == 200)
        links = (
            ok.select(
                F.col("url").alias("parent_link"),
                F.explode(extract_hrefs(F.col("html"))).alias("href"),
            )
            .filter(linkops.keep_link(F.col("href")) & linkops.is_relative(F.col("href")))
            .select(
                "parent_link",
                linkops.resolve_relative(F.col("href"), ROOT_SITE).alias("child_link"),
            )
            .distinct()
        )
        edge_frames.append(
            links.select(
                F.lit(depth).alias("pen_depth"), "parent_link", "child_link"
            )
        )
        frontier = links.select(F.col("child_link").alias("url")).distinct()

    edges = edge_frames[0]
    for f in edge_frames[1:]:
        edges = edges.union(f)
    # Q4: unvisited last-frontier children still join the vertex table.
    unique_links = visited.union(frontier.join(visited, "url", "left_anti")).select("url")
    return edges.transform(materialize), unique_links.transform(materialize)


@register(
    "crawl_spider_edges",
    oracle=f"""
WITH RECURSIVE {_SQL_WALK}
SELECT m.depth AS pen_depth, s.url AS parent_link,
       '{ROOT_SITE}p' || CAST((7 * m.doc_id + ks.k) % {SITE_MOD} AS VARCHAR) AS child_link
FROM mindepth m
JOIN site s ON s.doc_id = m.doc_id AND s.status = 200
CROSS JOIN (SELECT unnest([1, 2]) AS k) ks
WHERE m.depth < {CRAWL_DEPTH}
""",
)
def crawl_spider_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's ``indexing`` table from a depth-{d} crawl of the
    synthetic site (run_spider end-to-end, web_spider_oo.py:91-138)."""
    edges, _ = _spider_run(spark, sf_dir)
    return edges


@register(
    "crawl_spider_unique_links",
    oracle=f"""
WITH RECURSIVE {_SQL_WALK}
SELECT CAST(ROW_NUMBER() OVER (ORDER BY url) - 1 AS BIGINT) AS link_id, url AS link_name
FROM (SELECT DISTINCT s.url FROM mindepth m JOIN site s ON s.doc_id = m.doc_id) t
""",
)
def crawl_spider_unique_links(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's ``unique_links`` table (web_spider_oo.py:321-326)
    from the same crawl: every URL attempted or discovered (including the
    last frontier — quirk Q4), dense IDs in URL sort order (quirk Q3's
    deterministic replacement) via the two-phase assigner."""
    from .relational import assign_dense_ids

    _, unique = _spider_run(spark, sf_dir)
    named = unique.select(F.col("url").alias("link_name"))
    return assign_dense_ids(named, "link_name").select("link_id", "link_name")


CRAWL_BUDGET = 500  # pages per scheduling round


@register(
    "crawl_budget_allocation",
    oracle=f"""
WITH counts AS (SELECT source, COUNT(*) AS n_pages FROM documents GROUP BY source),
tot AS (SELECT SUM(n_pages) AS total FROM counts),
alloc AS (
  SELECT c.source, c.n_pages,
         CAST(({CRAWL_BUDGET} * c.n_pages) // t.total AS BIGINT) AS base,
         CAST(({CRAWL_BUDGET} * c.n_pages) % t.total AS BIGINT) AS rem
  FROM counts c CROSS JOIN tot t
),
spare AS (SELECT {CRAWL_BUDGET} - SUM(base) AS r FROM alloc),
ranked AS (
  SELECT source, n_pages, base,
         ROW_NUMBER() OVER (ORDER BY rem DESC, source) AS rk
  FROM alloc
)
SELECT ranked.source, ranked.n_pages,
       base + CASE WHEN rk <= spare.r THEN 1 ELSE 0 END AS alloc
FROM ranked CROSS JOIN spare
""",
)
def crawl_budget_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-domain crawl-budget apportionment by the largest-remainder
    (Hamilton) method: each domain gets floor(B·n/total) pages, and the
    leftover budget goes to the largest integer remainders (source
    tiebreak).  Pure integer arithmetic end to end, so the split is
    engine- and partitioning-exact — the scheduling step a polite
    distributed crawler runs before each frontier round (the reference
    crawls domains serially, web_spider_oo.py:202-214; at cluster scale
    the budget per domain IS the politeness control).

    One-shot apportionment by design: when the budget exceeds a domain's
    page count the allocation may exceed it too (the crawler simply
    exhausts the domain) — surplus is NOT redistributed, which keeps the
    split single-pass and engine-exact.

    Plan: one tiny per-domain count, a 1-row total broadcast back, and a
    |domains|-row window — no data-sized shuffle anywhere."""
    from pyspark.sql import Window

    docs = load(spark, sf_dir, "documents")
    counts = docs.groupBy("source").agg(F.count(F.lit(1)).alias("n_pages"))
    tot = counts.agg(F.sum("n_pages").alias("total"))
    # `div` = exact integer division (no double round-trip, unlike floor(a/b))
    alloc = counts.crossJoin(F.broadcast(tot)).select(
        "source",
        "n_pages",
        F.expr(f"({CRAWL_BUDGET} * n_pages) div total").alias("base"),
        F.expr(f"({CRAWL_BUDGET} * n_pages) % total").alias("rem"),
    )
    spare = alloc.agg((F.lit(CRAWL_BUDGET) - F.sum("base")).alias("r"))
    w = Window.orderBy(F.col("rem").desc(), "source")
    return (
        alloc.withColumn("rk", F.row_number().over(w))
        .crossJoin(F.broadcast(spare))
        .select(
            "source",
            "n_pages",
            (F.col("base") + F.when(F.col("rk") <= F.col("r"), 1).otherwise(0)).alias(
                "alloc"
            ),
        )
    )


# ---------------------------------------------------------------------------
# Politeness audit: verify the rate-limit contract from the fetch log.
# The reference ENFORCES politeness with a sleep between requests
# (web_spider_oo.py:231-232,246); this is the companion AUDIT — given a
# fetch/event log, did any agent violate the minimum inter-request gap?
# ---------------------------------------------------------------------------
POLITENESS_MIN_GAP_S = 60


@register(
    "politeness_gap_audit",
    oracle=f"""
WITH g AS (
  SELECT user_id, ts,
         date_diff('second',
                   LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id),
                   ts) AS gap_s
  FROM events
)
SELECT user_id,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(MIN(gap_s) AS BIGINT) AS min_gap_s,
       ROUND(CAST(SUM(CAST(gap_s AS DECIMAL(18,6))) AS DOUBLE) / COUNT(gap_s), 6)
         AS avg_gap_s,
       CASE WHEN MIN(gap_s) >= {POLITENESS_MIN_GAP_S} THEN 1 ELSE 0 END AS polite
FROM g GROUP BY user_id ORDER BY user_id
""",
)
def politeness_gap_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-agent inter-request gap audit over the event log: minimum and
    mean gap in seconds (lag over a (ts, event_id)-ordered window — the
    id tie-break makes same-second events deterministic) and a polite
    flag for agents whose every gap respects the minimum.

    Scale: one shuffle keyed on user_id (the window partition key);
    gaps are integer second diffs (exact on both engines) and the mean
    uses the DECIMAL-accumulation discipline.  At 100 TB the window
    parallelizes per agent — no global order is ever materialized.
    """
    from pyspark.sql import Window

    ev = load_spread(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    g = ev.select(
        "user_id",
        (
            F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts").over(w))
        ).alias("gap_s"),
    )
    return (
        g.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("gap_s").cast("long").alias("min_gap_s"),
            F.round(
                F.sum(F.col("gap_s").cast("decimal(18,6)")).cast("double")
                / F.count("gap_s"),
                6,
            ).alias("avg_gap_s"),
            F.when(F.min("gap_s") >= POLITENESS_MIN_GAP_S, 1)
            .otherwise(0)
            .alias("polite"),
        )
        .orderBy("user_id")
    )
