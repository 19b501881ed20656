"""RSS 2.0 / Atom feed parsing → crawl frontier entries.

Feeds are the push-style twin of sitemap discovery (sources/sitemap.py):
hosts advertise their newest content with per-entry permalinks and dates, a
crawler polls them to find fresh URLs between sitemap refreshes.  Entries
normalize to the same (host, loc, lastmod_day) contract sitemap_frontier
consumes, so the diff-against-crawl-state logic is shared, not duplicated.

Spark-first: entry blocks pulled with one JVM ``regexp_extract_all`` +
``explode`` (no XML library, no python stage — same discipline as the
sitemap and StackExchange scans); per-block fields extracted with JVM regex
and array expressions only.  Dates normalize to ISO ``YYYY-MM-DD`` STRINGS
(lexicographic compare is correct; cross-engine timestamp semantics stay
out of the plan — CLAUDE.md date-math trap).

Parsing contract (documented subset, unit-pinned):
* RSS: ``<item>`` blocks; ``<link>`` inner text; ``<title>`` with optional
  CDATA wrapper; ``pubDate`` RFC-822 day converted via a month-name map.
* Atom: ``<entry>`` blocks; the first ``<link>`` whose ``rel`` is absent or
  ``alternate`` (the spec default — ``rel="self"``/``rel="edit"`` links are
  skipped); ``<updated>`` ISO prefix.
* Entries with no resolvable link identify nothing and are dropped.

100 TB shape: feed files are |hosts|-scale (tiny next to the page table);
everything here is a narrow JVM projection, and the frontier diff broadcasts
under AQE exactly as the sitemap path does.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_ITEM_RE = r"(?s)<item[\s>].*?</item\s*>"
_ENTRY_RE = r"(?s)<entry[\s>].*?</entry\s*>"
_RSS_LINK_RE = r"(?s)<link\s*>\s*([^<]*?)\s*</link\s*>"
_TITLE_RE = r"(?s)<title[^>]*>(.*?)</title\s*>"
_CDATA_RE = r"(?s)^<!\[CDATA\[(.*)\]\]>$"
_RFC822_DAY_RE = r"<pubDate\s*>[^<]*?(\d{1,2})\s+(\w{3})\s+(\d{4})"
_ATOM_DAY_RE = r"<updated\s*>\s*(\d{4}-\d{2}-\d{2})"

_MONTHS = [
    "Jan", "Feb", "Mar", "Apr", "May", "Jun",
    "Jul", "Aug", "Sep", "Oct", "Nov", "Dec",
]


def _clean_title(block: Column) -> Column:
    raw = F.trim(F.regexp_extract(block, _TITLE_RE, 1))
    return F.nullif(
        F.when(
            raw.rlike(r"^<!\[CDATA\["), F.regexp_extract(raw, _CDATA_RE, 1)
        ).otherwise(raw),
        F.lit(""),
    )


def _rfc822_day(block: Column) -> Column:
    """RFC-822 ``15 Aug 2026`` → ISO ``2026-08-15`` (NULL when absent or the
    month name is unknown)."""
    day = F.regexp_extract(block, _RFC822_DAY_RE, 1)
    mon = F.array_position(
        F.array(*[F.lit(m) for m in _MONTHS]),
        F.regexp_extract(block, _RFC822_DAY_RE, 2),
    )
    year = F.regexp_extract(block, _RFC822_DAY_RE, 3)
    return F.when(
        (day != "") & (mon > 0),
        F.concat_ws(
            "-",
            year,
            F.lpad(mon.cast("string"), 2, "0"),
            F.lpad(day, 2, "0"),
        ),
    )


def _atom_link(block: Column) -> Column:
    """First <link> tag whose rel is absent or 'alternate' (spec default)."""
    tags = F.regexp_extract_all(block, F.lit(r"<link[^>]*>"), F.lit(0))
    good = F.filter(
        tags,
        lambda t: (~t.rlike(r'rel\s*=')) | t.rlike(r'rel\s*=\s*["\']alternate'),
    )
    return F.nullif(
        F.regexp_extract(F.get(good, 0), r'href\s*=\s*["\']([^"\']*)', 1),
        F.lit(""),
    )


def parse_feed_entries(
    feeds: DataFrame, host_col: str = "host", xml_col: str = "feed_xml"
) -> DataFrame:
    """(host, feed_xml) → (host, link, title, pub_day, feed_type) — one row
    per feed entry with a resolvable permalink."""
    is_atom = F.col(xml_col).rlike(r"<feed[\s>]")
    blocks = feeds.select(
        F.col(host_col).alias("host"),
        is_atom.alias("is_atom"),
        F.explode(
            F.when(
                is_atom,
                F.regexp_extract_all(F.col(xml_col), F.lit(_ENTRY_RE), F.lit(0)),
            ).otherwise(
                F.regexp_extract_all(F.col(xml_col), F.lit(_ITEM_RE), F.lit(0))
            )
        ).alias("block"),
    )
    link = F.when(F.col("is_atom"), _atom_link(F.col("block"))).otherwise(
        F.nullif(F.regexp_extract("block", _RSS_LINK_RE, 1), F.lit(""))
    )
    pub_day = F.when(
        F.col("is_atom"),
        F.nullif(F.regexp_extract("block", _ATOM_DAY_RE, 1), F.lit("")),
    ).otherwise(_rfc822_day(F.col("block")))
    return (
        blocks.select(
            "host",
            link.alias("link"),
            _clean_title(F.col("block")).alias("title"),
            pub_day.alias("pub_day"),
            F.when(F.col("is_atom"), F.lit("atom"))
            .otherwise(F.lit("rss"))
            .alias("feed_type"),
        )
        .where(F.col("link").isNotNull())
    )


def feed_frontier(
    entries: DataFrame,
    crawl_state: DataFrame,
    url_col: str = "url",
    crawled_day_col: str = "last_crawl_day",
) -> DataFrame:
    """Feed entries diffed against crawl state — delegates to
    :func:`aiwhispr_spark.sources.sitemap.sitemap_frontier` after mapping to
    its (host, loc, lastmod_day) contract (one frontier policy, two
    discovery sources)."""
    from aiwhispr_spark.sources.sitemap import sitemap_frontier

    mapped = entries.select(
        "host", F.col("link").alias("loc"), F.col("pub_day").alias("lastmod_day")
    )
    return sitemap_frontier(mapped, crawl_state, url_col, crawled_day_col)
