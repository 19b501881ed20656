"""Meta-robots directive compliance for web corpora: pages whose authors
opted out of indexing (``<meta name="robots" content="noindex">``) must be
dropped before any downstream use — the crawl-hygiene rule every responsible
Common-Crawl-style pipeline applies first (the reference indexes only local
files and never needs it; this belongs to the web-curation tier the engine
adds).

Semantics
---------
* The directive tag is any ``<meta ...>`` whose ``name`` attribute is
  ``robots`` (case-insensitive, either attribute order, single/double/no
  quotes).
* ``noindex`` (as a token) or a bare ``none`` content value ⇒ the page is not
  indexable; ``nofollow``/``none`` ⇒ its outlinks must not feed the link
  graph (operators/linkgraph.py callers filter on ``nofollow_i`` before
  ``extract_links``).
* A ``noindex`` mention under any OTHER meta name (e.g. a description that
  quotes the word) is NOT a directive — the tag match keys on name=robots.

Regexes stay inside the Java≡RE2 common subset (no lookaround, no backrefs)
so the DuckDB oracle runs the byte-same patterns.

100 TB shape: pure JVM regexp expressions over the html column — zero
shuffle, zero Python; the filter composes with the scan and is pushed into
the same whole-stage-codegen span as the rest of the curation chain.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# full <meta ...> tag whose name attribute is robots, either attribute order
META_ROBOTS_TAG = r"(?is)<meta\b[^>]*\bname\s*=\s*[\"']?robots\b[^>]*>"
# content attribute value inside the matched tag
CONTENT_VALUE = r"(?is)\bcontent\s*=\s*[\"']?([^\"'>]*)"


def robots_content_expr(html: Column) -> Column:
    """The content value of the page's meta-robots tag ('' if absent)."""
    tag = F.regexp_extract(html, META_ROBOTS_TAG, 0)
    return F.regexp_extract(tag, CONTENT_VALUE, 1)


def meta_robots_flags(
    df: DataFrame, html_col: str = "html_text"
) -> DataFrame:
    """Add ``noindex_i`` / ``nofollow_i`` BIGINT flags derived from the page's
    meta-robots directive (0 when no directive is present)."""
    cval = robots_content_expr(F.col(html_col))
    noindex = cval.rlike(r"(?i)\bnoindex\b") | (
        F.lower(F.trim(cval)) == "none"
    )
    nofollow = cval.rlike(r"(?i)\bnofollow\b") | (
        F.lower(F.trim(cval)) == "none"
    )
    return df.withColumn("noindex_i", noindex.cast("long")).withColumn(
        "nofollow_i", nofollow.cast("long")
    )


def filter_indexable(df: DataFrame, html_col: str = "html_text") -> DataFrame:
    """Drop pages whose meta-robots directive forbids indexing."""
    flagged = meta_robots_flags(df, html_col)
    return flagged.where(F.col("noindex_i") == 0).drop(
        "noindex_i", "nofollow_i"
    )
