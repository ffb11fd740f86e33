"""Reference-traced link-pipeline queries (SURVEY.md §2.1 O6/O8/O9/O11/O18).

The driver's fixture tables have no raw-links table, so each query first
DERIVES a deterministic link column from the ``documents`` table (pure
expressions on existing columns — identical in Spark and oracle SQL), then
applies the reference-traced operator to it.  What is being tested is the
operator semantics, not the synthesized input.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import linkops
from ..registry import register
from ..sources.tables import load

# A deterministic synthetic href per document: absolute for doc_id%7==0
# (reference drops those, web_spider_oo.py:299), NULL-ish for %11==0
# (anchor without href), bare "/" for %13==0, else a relative link whose
# path embeds source+lang+doc_id — so some hit blocklist words via 'src'?
# no: blocklist hits come from lang codes colliding with nothing; we embed
# an explicit blocked word for doc_id%5==0 to exercise the filter.
_HREF_SQL = """
CASE
  WHEN doc_id % 11 = 0 THEN NULL
  WHEN doc_id % 13 = 0 THEN '/'
  WHEN doc_id % 7 = 0 THEN 'http://other.test/' || source
  WHEN doc_id % 5 = 0 THEN '/careers/' || source
  ELSE '/' || lang || '/' || source || '/doc-' || CAST(doc_id AS VARCHAR)
END
"""


def _with_href(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    href = (
        F.when(F.col("doc_id") % 11 == 0, F.lit(None).cast("string"))
        .when(F.col("doc_id") % 13 == 0, F.lit("/"))
        .when(F.col("doc_id") % 7 == 0, F.concat(F.lit("http://other.test/"), F.col("source")))
        .when(F.col("doc_id") % 5 == 0, F.concat(F.lit("/careers/"), F.col("source")))
        .otherwise(
            F.concat(
                F.lit("/"),
                F.col("lang"),
                F.lit("/"),
                F.col("source"),
                F.lit("/doc-"),
                F.col("doc_id").cast("string"),
            )
        )
    )
    return docs.select("doc_id", "lang", "source", href.alias("href"))


def _oracle_not_blocked(col: str) -> str:
    """DuckDB twin of linkops.is_blocked — NULL / '/' / substring blocklist."""
    likes = " AND ".join(f"{col} NOT LIKE '%{w}%'" for w in linkops.BLOCKLIST)
    return f"{col} IS NOT NULL AND {col} <> '/' AND {likes}"


@register(
    "filter_blocklist",
    oracle=f"""
WITH hrefs AS (SELECT doc_id, ({_HREF_SQL}) AS href FROM documents)
SELECT doc_id, href FROM hrefs
WHERE {_oracle_not_blocked('href')}
""",
)
def filter_blocklist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocklist filter (web_spider_oo.py:292-297): drop NULL, bare "/",
    and any link containing a blocklist substring.

    Scale: a conjunction of contains() predicates — codegen'd, pushed to
    the scan; no regex engine, no UDF.
    """
    return _with_href(spark, sf_dir).filter(linkops.keep_link(F.col("href"))).select(
        "doc_id", "href"
    )


@register(
    "route_by_suffix",
    oracle=f"""
WITH urls AS (
  SELECT doc_id,
         'http://site.test/' || source || '/f' || CAST(doc_id AS VARCHAR) ||
         CASE WHEN doc_id % 10 = 0 THEN '.PDF'
              WHEN doc_id % 10 = 1 THEN '.xlsx'
              WHEN doc_id % 10 = 2 THEN '.xls'
              ELSE '.html' END AS url
  FROM documents
)
SELECT doc_id, url,
       CASE WHEN lower(url) LIKE '%pdf' THEN 'pdf'
            WHEN lower(url) LIKE '%xlsx' OR lower(url) LIKE '%xls' THEN 'skip'
            ELSE 'text' END AS route
FROM urls
""",
)
def route_by_suffix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-type routing by URL suffix (web_spider_oo.py:107-115):
    pdf → pdf sink, xls/xlsx → skipped, else text sink."""
    docs = load(spark, sf_dir, "documents")
    url = F.concat(
        F.lit("http://site.test/"),
        F.col("source"),
        F.lit("/f"),
        F.col("doc_id").cast("string"),
        F.when(F.col("doc_id") % 10 == 0, F.lit(".PDF"))
        .when(F.col("doc_id") % 10 == 1, F.lit(".xlsx"))
        .when(F.col("doc_id") % 10 == 2, F.lit(".xls"))
        .otherwise(F.lit(".html")),
    )
    return docs.select("doc_id", url.alias("url")).select(
        "doc_id", "url", linkops.suffix_route(F.col("url")).alias("route")
    )


@register(
    "rewrite_relative_urls",
    oracle=f"""
WITH hrefs AS (SELECT doc_id, ({_HREF_SQL}) AS href FROM documents)
SELECT doc_id,
       'http://root.test/' || substring(href, 2) AS resolved_url
FROM hrefs
WHERE href LIKE '/%' AND href <> '/'
""",
)
def rewrite_relative_urls(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Relative-URL resolution (web_spider_oo.py:299): keep "/"-prefixed
    links only (absolute links are dropped — reference quirk Q2, kept) and
    prepend the root site."""
    hrefs = _with_href(spark, sf_dir)
    return (
        hrefs.filter(linkops.is_relative(F.col("href")) & (F.col("href") != "/"))
        .select(
            "doc_id",
            linkops.resolve_relative(F.col("href"), "http://root.test/").alias("resolved_url"),
        )
    )


@register(
    "sanitize_filename",
    oracle=r"""
SELECT doc_id,
       translate('http://site.test' || '/' || source || '/doc:' || CAST(doc_id AS VARCHAR),
                 '\/?:', '____') || '.txt' AS file_name
FROM documents
""",
)
def sanitize_filename(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-name derivation (web_spider_oo.py:367-390): ``\\ / ? :`` each
    become ``_``; extension appended."""
    docs = load(spark, sf_dir, "documents")
    raw = F.concat(
        F.lit("http://site.test/"),
        F.col("source"),
        F.lit("/doc:"),
        F.col("doc_id").cast("string"),
    )
    return docs.select(
        "doc_id",
        F.concat(linkops.sanitize_filename(raw), F.lit(".txt")).alias("file_name"),
    )


@register(
    "md5_name",
    oracle="""
SELECT doc_id, md5(source || '|' || CAST(doc_id AS VARCHAR)) AS name_hash
FROM documents
""",
)
def md5_name(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hash-based file naming — the md5 variant the reference left
    commented out (web_spider_oo.py:386)."""
    docs = load(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        linkops.md5_name(F.col("source"), F.lit("|"), F.col("doc_id").cast("string")).alias(
            "name_hash"
        ),
    )


@register(
    "edges_from_children",
    oracle=f"""
WITH hrefs AS (SELECT doc_id, ({_HREF_SQL}) AS href FROM documents),
children AS (
  SELECT DISTINCT 'http://root.test/' || substring(href, 2) AS child_link
  FROM hrefs WHERE href LIKE '/%' AND href <> '/'
)
SELECT 1 AS pen_depth, 'http://root.test/' AS parent_link, child_link
FROM children
""",
)
def edges_from_children(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edge construction (web_spider_oo.py:302-319): the cross product of a
    literal (depth, parent) with the child-link set — per-page semantics
    (SURVEY quirk Q1: docstring semantics, not the accumulated-set bug)."""
    hrefs = _with_href(spark, sf_dir)
    children = (
        hrefs.filter(linkops.is_relative(F.col("href")) & (F.col("href") != "/"))
        .select(linkops.resolve_relative(F.col("href"), "http://root.test/").alias("child_link"))
        .distinct()
    )
    return children.select(
        F.lit(1).alias("pen_depth"),
        F.lit("http://root.test/").alias("parent_link"),
        F.col("child_link"),
    )


# A deterministically "messy" URL per document — every normalization
# hazard the crawler meets in the wild (the reference crawls raw href
# strings, web_spider_oo.py:288-299, and would revisit the same page
# under each spelling): mixed-case scheme/host, explicit default port,
# fragments, unsorted query params, trailing slashes.
_MESSY_URL_SQL = """
(CASE WHEN doc_id % 2 = 0 THEN 'HTTP' ELSE 'http' END) || '://' ||
'Site' || CAST(doc_id % 3 AS VARCHAR) || '.Example.COM' ||
(CASE WHEN doc_id % 4 = 0 THEN ':80' ELSE '' END) ||
'/P' || CAST(doc_id AS VARCHAR) ||
(CASE WHEN doc_id % 5 = 0 THEN '/' ELSE '' END) ||
(CASE WHEN doc_id % 3 = 0 THEN '?b=2&a=1'
      WHEN doc_id % 3 = 1 THEN '?a=1&b=2' ELSE '' END) ||
(CASE WHEN doc_id % 2 = 0 THEN '#frag' ELSE '' END)
"""


@register(
    "url_canonicalize",
    oracle=f"""
WITH raw AS (SELECT doc_id, ({_MESSY_URL_SQL}) AS url FROM documents),
s1 AS (SELECT doc_id, url, split_part(url, '#', 1) AS nofrag FROM raw),
s2 AS (
  SELECT doc_id, url,
         lower(split_part(nofrag, '://', 1)) AS scheme,
         split_part(nofrag, '://', 2) AS rest
  FROM s1
),
s3 AS (
  SELECT doc_id, url, scheme,
         split_part(rest, '?', 1) AS restpath,
         CASE WHEN rest LIKE '%?%' THEN split_part(rest, '?', 2) ELSE '' END AS query
  FROM s2
),
s4 AS (
  SELECT doc_id, url, scheme, query,
         CASE WHEN scheme = 'http'
              THEN regexp_replace(lower(split_part(restpath, '/', 1)), ':80$', '')
              WHEN scheme = 'https'
              THEN regexp_replace(lower(split_part(restpath, '/', 1)), ':443$', '')
              ELSE lower(split_part(restpath, '/', 1)) END AS host,
         CASE WHEN length(restpath) > length(split_part(restpath, '/', 1))
              THEN substring(restpath, length(split_part(restpath, '/', 1)) + 1)
              ELSE '/' END AS path
  FROM s3
)
SELECT doc_id, url,
       scheme || '://' || host ||
       (CASE WHEN path <> '/' THEN regexp_replace(path, '/+$', '') ELSE path END) ||
       (CASE WHEN query <> ''
             THEN '?' || array_to_string(list_sort(string_split(query, '&')), '&')
             ELSE '' END) AS canonical_url
FROM s4
""",
)
def url_canonicalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL canonicalization — the frontier-dedup key the reference's raw
    string set (web_spider_oo.py:63 ``unique_links_set``) should have
    used: lowercase scheme+host, strip the default :80 port, drop the
    fragment, sort query params, strip trailing path slashes.  Pure
    Catalyst string expressions (split_part / regexp / array_sort), so
    at scale it is a map-only projection fused into the scan."""
    docs = load(spark, sf_dir, "documents")
    d = F.col("doc_id")
    url = F.concat(
        F.when(d % 2 == 0, F.lit("HTTP")).otherwise(F.lit("http")),
        F.lit("://Site"),
        (d % 3).cast("string"),
        F.lit(".Example.COM"),
        F.when(d % 4 == 0, F.lit(":80")).otherwise(F.lit("")),
        F.lit("/P"),
        d.cast("string"),
        F.when(d % 5 == 0, F.lit("/")).otherwise(F.lit("")),
        F.when(d % 3 == 0, F.lit("?b=2&a=1"))
        .when(d % 3 == 1, F.lit("?a=1&b=2"))
        .otherwise(F.lit("")),
        F.when(d % 2 == 0, F.lit("#frag")).otherwise(F.lit("")),
    )
    raw = docs.select("doc_id", url.alias("url"))
    return raw.select(
        "doc_id", "url", canonicalize_url(F.col("url")).alias("canonical_url")
    )


def canonicalize_url(url):
    """Canonical-URL Column expression (idempotent by construction):
    lowercase scheme+host, strip the scheme's DEFAULT port only (:80 for
    http, :443 for https — ``https://h:80`` keeps its port), drop
    fragment, sort query params, strip trailing path slashes.

    The query string is split off BEFORE hostport extraction so host-only
    URLs (``http://host?a=1``) keep their query instead of having it
    swallowed into the host token."""
    nofrag = F.split_part(url, F.lit("#"), F.lit(1))
    scheme = F.lower(F.split_part(nofrag, F.lit("://"), F.lit(1)))
    rest = F.split_part(nofrag, F.lit("://"), F.lit(2))
    restpath = F.split_part(rest, F.lit("?"), F.lit(1))
    query = F.when(
        rest.contains("?"), F.split_part(rest, F.lit("?"), F.lit(2))
    ).otherwise(F.lit(""))
    hostport = F.split_part(restpath, F.lit("/"), F.lit(1))
    hostl = F.lower(hostport)
    host = (
        F.when(scheme == "http", F.regexp_replace(hostl, ":80$", ""))
        .when(scheme == "https", F.regexp_replace(hostl, ":443$", ""))
        .otherwise(hostl)
    )
    path = F.when(
        F.length(restpath) > F.length(hostport),
        F.substring(restpath, F.length(hostport) + 1, F.lit(1 << 30)),
    ).otherwise(F.lit("/"))
    canon_path = F.when(path != "/", F.regexp_replace(path, "/+$", "")).otherwise(path)
    canon_query = F.when(
        query != "",
        F.concat(F.lit("?"), F.array_join(F.array_sort(F.split(query, "&")), "&")),
    ).otherwise(F.lit(""))
    return F.concat(scheme, F.lit("://"), host, canon_path, canon_query)
