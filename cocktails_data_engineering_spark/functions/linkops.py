"""Link/URL scalar operators, re-expressed as Catalyst column expressions.

Traces to the reference's link-cleaning layer:

- blocklist predicate        -> ``scripts/spiders/web_spider_oo.py:292-297``
  (substring blocklist constant at ``web_spider_oo.py:195-226``; the
  duplicate ``"google"`` entry there is collapsed — set semantics)
- relative-URL resolution    -> ``web_spider_oo.py:299`` (keeps only
  ``/``-prefixed links, prepends the root site)
- per-page distinct          -> ``web_spider_oo.py:300``
- file-name sanitization     -> ``web_spider_oo.py:367-390`` (``\\ / ? :``
  each replaced by ``_``; extension appended)
- md5 naming (commented-out in the reference at ``web_spider_oo.py:386``)

All are pure built-in-function expressions: they stay inside whole-stage
codegen, push down as parquet filters where possible, and never touch
Python at row granularity.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Substring blocklist from web_spider_oo.py:195-226 (27 distinct entries;
# the reference lists "google" twice and both "app"/"App" — contains() is
# case-sensitive there, so both casings are kept).
BLOCKLIST: tuple[str, ...] = (
    "career",
    "login",
    "main-content",
    "pay",
    "your",
    "form",
    "#",
    "account",
    "auth",
    "contact",
    "activate",
    "reservation",
    "book",
    "tel",
    "facebook",
    "instagram",
    "subscribe",
    "google",
    "linkedin",
    "youtube",
    "mail",
    "app",
    "App",
    "help",
    "sponsor",
    "terms",
    "twitter",
    "@",
)


def is_blocked(link: Column) -> Column:
    """True if the link is NULL, bare "/", or contains any blocklist word.

    Semantics of ``clean_webpage_links`` (web_spider_oo.py:292-297): a link
    survives only if it is not None, not "/", and contains none of the
    substrings.  Expressed as a chain of ``contains`` ORs — Catalyst folds
    this into one codegen'd predicate; no regex engine needed.
    """
    blocked = link.isNull() | (link == "/")
    for word in BLOCKLIST:
        blocked = blocked | link.contains(word)
    return blocked


def keep_link(link: Column) -> Column:
    return ~is_blocked(link)


def resolve_relative(link: Column, root_site: Column | str) -> Column:
    """``root_site + link[1:]`` for "/"-prefixed links (web_spider_oo.py:299).

    Absolute links are the caller's business to drop (the reference drops
    them implicitly by keeping only "/"-prefixed hrefs).
    """
    root = F.lit(root_site) if isinstance(root_site, str) else root_site
    return F.concat(root, link.substr(F.lit(2), F.length(link)))


def is_relative(link: Column) -> Column:
    return link.startswith("/")


def sanitize_filename(name: Column) -> Column:
    """Replace ``\\ / ? :`` with ``_`` (web_spider_oo.py:382-385)."""
    return F.translate(name, "\\/?:", "____")


def derive_output_filename(root_site: Column, url: Column, ext: Column | str) -> Column:
    """Sanitized ``root + url + "." + ext`` (web_spider_oo.py:367-390)."""
    ext_col = F.lit(ext) if isinstance(ext, str) else ext
    return F.concat(sanitize_filename(root_site), sanitize_filename(url), F.lit("."), ext_col)


def md5_name(*cols: Column) -> Column:
    """md5 of the concatenated parts — the hash-naming variant the reference
    left commented out at web_spider_oo.py:386."""
    return F.md5(F.concat(*cols))


def suffix_route(url: Column) -> Column:
    """Content-type routing by URL suffix (web_spider_oo.py:107-115):
    pdf -> "pdf" sink, xlsx/xls -> "skip", anything else -> "text"."""
    lowered = F.lower(url)
    return (
        F.when(lowered.endswith("pdf"), F.lit("pdf"))
        .when(lowered.endswith("xlsx") | lowered.endswith("xls"), F.lit("skip"))
        .otherwise(F.lit("text"))
    )
