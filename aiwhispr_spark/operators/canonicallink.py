"""rel=canonical duplicate-cluster election: group pages by their declared
``<link rel="canonical" href="...">`` target and elect one keeper per
cluster — the page-declared twin of content dedup (operators/dedup.py
elects keepers by BYTES; this trusts the site's own declaration, the
signal crawlers apply first because it is free).

Semantics (oracle-mirrored):
* the FIRST rel=canonical link tag per page wins (attributes in any
  order, double quotes); pages declaring nothing (or declaring
  themselves) map to themselves with ``declared_i = 0``;
* ONE hop only — a canonical target that itself canonicalizes elsewhere
  is a chain, which is operators/redirects.py's job (feed it
  ``canonical_map`` edges);
* cluster keeper = the canonical url itself when it is a corpus page
  (``in_corpus_i = 1``), else the lexicographically-min member.

100 TB shape: extraction + self-map defaulting is one narrow JVM regex
projection; the cluster rollup is ONE groupBy keyed on the canonical url
carrying (canonical, member) pairs; corpus membership joins the
|clusters|-sized rollup against a DISTINCT url projection — AQE
broadcasts whichever side is small.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_LINK_TAG_RE = r"(?i)<link\b[^>]*>"
_REL_CANON_RE = r'(?i)\brel="canonical"'
_HREF_RE = r'\bhref="([^"]+)"'


def canonical_map(
    pages: DataFrame, url_col: str = "url", html_col: str = "html"
) -> DataFrame:
    """(url, canonical, declared_i) for EVERY page — undeclared and
    self-declared pages map to themselves with declared_i = 0."""
    html_str = F.col(html_col).cast("string")
    tags = F.filter(
        F.regexp_extract_all(html_str, F.lit(_LINK_TAG_RE), F.lit(0)),
        lambda tag: tag.rlike(_REL_CANON_RE)
        & (F.regexp_extract(tag, _HREF_RE, 1) != ""),
    )
    # F.get, not element_at: ANSI mode (session default) makes element_at
    # RAISE on the empty tag array; get is NULL-safe
    target = F.regexp_extract(F.get(tags, 0), _HREF_RE, 1)
    url = F.col(url_col)
    declared = target.isNotNull() & (target != "") & (target != url)
    return pages.select(
        url.alias("url"),
        F.when(declared, target).otherwise(url).alias("canonical"),
        F.when(declared, F.lit(1)).otherwise(F.lit(0)).cast("int").alias("declared_i"),
    )


def canonical_clusters(
    pages: DataFrame, url_col: str = "url", html_col: str = "html"
) -> DataFrame:
    """(canonical, keeper, n_members, in_corpus_i) — one row per declared
    canonical target (see module contract)."""
    cmap = canonical_map(pages, url_col, html_col)
    rollup = cmap.groupBy("canonical").agg(
        F.count(F.lit(1)).cast("long").alias("n_members"),
        F.min("url").alias("_min_member"),
    )
    corpus = cmap.select(F.col("url").alias("canonical")).distinct().withColumn(
        "_in", F.lit(1)
    )
    return rollup.join(corpus, "canonical", "left").select(
        "canonical",
        F.when(F.col("_in").isNotNull(), F.col("canonical"))
        .otherwise(F.col("_min_member"))
        .alias("keeper"),
        "n_members",
        F.coalesce("_in", F.lit(0)).cast("int").alias("in_corpus_i"),
    )
