"""Sitemap-XML URL discovery → crawl frontier.

Sitemaps (sitemaps.org protocol) are how hosts advertise their canonical URL
inventory plus last-modification dates; a crawler diffs them against its own
crawl state to decide what to fetch next.  This is the discovery twin of the
robots.txt fetch-policy engine (operators/robots.py) and composes with
`urlnorm.crawl_schedule_priority` for budget allocation.

Spark-first: `<url>` blocks pulled with one JVM ``regexp_extract_all`` +
``explode`` (no XML library, no python stage — same discipline as the
StackExchange XML scan); loc/lastmod extracted per block.  Dates stay ISO
``YYYY-MM-DD`` STRINGS end-to-end — lexicographic compare is correct for ISO
dates and sidesteps cross-engine timestamp semantics (CLAUDE.md date-math
trap).

100 TB shape: sitemap files are |hosts|-scale (tiny next to the page table);
the frontier join broadcasts crawl-state onto sitemap entries or vice versa
under AQE; everything is narrow JVM regex until the single status join.

Reference parity: the reference crawls nothing (local files only) — this is
an engine addition under the web-curation tier (SURVEY §2.8).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# one <url>...</url> entry block (non-greedy, dot-matches-newline)
_URL_BLOCK_RE = r"(?s)<url\s*>.*?</url\s*>"
_LOC_RE = r"(?s)<loc\s*>\s*([^<]*?)\s*</loc\s*>"
_LASTMOD_RE = r"(?s)<lastmod\s*>\s*(\d{4}-\d{2}-\d{2})"


def parse_sitemap_entries(
    sitemaps: DataFrame,
    host_col: str = "host",
    xml_col: str = "sitemap_xml",
) -> DataFrame:
    """(host, sitemap_xml) → (host, loc, lastmod_day) — one row per ``<url>``
    entry; ``lastmod_day`` is the ISO date prefix of the optional
    ``<lastmod>`` value, NULL when absent.  Entries with no ``<loc>`` are
    dropped (they identify nothing)."""
    blocks = sitemaps.select(
        F.col(host_col).alias("host"),
        F.explode(
            F.regexp_extract_all(F.col(xml_col), F.lit(_URL_BLOCK_RE), F.lit(0))
        ).alias("block"),
    )
    return (
        blocks.select(
            "host",
            F.regexp_extract("block", _LOC_RE, 1).alias("loc"),
            F.nullif(
                F.regexp_extract("block", _LASTMOD_RE, 1), F.lit("")
            ).alias("lastmod_day"),
        )
        .where(F.col("loc") != "")
    )


def sitemap_frontier(
    entries: DataFrame,
    crawl_state: DataFrame,
    url_col: str = "url",
    crawled_day_col: str = "last_crawl_day",
) -> DataFrame:
    """Diff sitemap entries against crawl state → fetch frontier.

    ``crawl_state`` is (url, last_crawl_day ISO string) — one row per url
    (pre-aggregate with ``urlnorm.latest_crawl_per_url`` otherwise).  Status
    per advertised URL:

    * ``new``     — never crawled
    * ``stale``   — lastmod strictly after the last crawl day
    * ``fresh``   — lastmod present and not after the last crawl day
    * ``unknown`` — crawled but the sitemap gives no lastmod (refetch on the
      regular schedule; surfaced so callers can apply their own policy)
    """
    st = crawl_state.select(
        F.col(url_col).alias("loc"),
        F.col(crawled_day_col).alias("last_crawl_day"),
    )
    joined = entries.join(st, "loc", "left")
    status = (
        F.when(F.col("last_crawl_day").isNull(), F.lit("new"))
        .when(F.col("lastmod_day").isNull(), F.lit("unknown"))
        .when(F.col("lastmod_day") > F.col("last_crawl_day"), F.lit("stale"))
        .otherwise(F.lit("fresh"))
    )
    return joined.select(
        "host",
        F.col("loc").alias("url"),
        "lastmod_day",
        "last_crawl_day",
        status.alias("status"),
    )


_SITEMAP_BLOCK_RE = r"(?s)<sitemap\s*>.*?</sitemap\s*>"


def parse_sitemap_index(
    sitemaps: DataFrame,
    host_col: str = "host",
    xml_col: str = "sitemap_xml",
) -> DataFrame:
    """Sitemap-INDEX expansion: big sites don't publish one sitemap, they
    publish a ``<sitemapindex>`` of ``<sitemap>`` children (the 50k-URL
    protocol cap forces it) — a discovery pipeline must fetch the children
    before :func:`parse_sitemap_entries` sees any ``<url>``.  Returns
    (host, child_loc, lastmod_day) — the child-sitemap FETCH LIST, same
    column contract as the entry parser so the frontier logic composes.
    ``<url>`` blocks in the same document are ignored here (and ``<sitemap>``
    blocks are invisible to the entry parser, which keys on ``<url>``), so
    mixed files route each block to exactly one parser.

    100 TB shape: same ONE-regexp_extract_all narrow JVM projection as the
    entry parser; zero shuffle, zero python.
    """
    blocks = sitemaps.select(
        F.col(host_col).alias("host"),
        F.explode(
            F.regexp_extract_all(F.col(xml_col), F.lit(_SITEMAP_BLOCK_RE), F.lit(0))
        ).alias("block"),
    )
    return (
        blocks.select(
            "host",
            F.regexp_extract("block", _LOC_RE, 1).alias("child_loc"),
            F.nullif(
                F.regexp_extract("block", _LASTMOD_RE, 1), F.lit("")
            ).alias("lastmod_day"),
        )
        .where(F.col("child_loc") != "")
    )
