"""hreflang alternate-cluster mining: group pages that declare each other
as language alternates (``<link rel="alternate" hreflang="xx" href="...">``)
into translation clusters — the multilingual twin of url canonicalization
(operators/urlnorm.py).  A web KG wants ONE entity page per cluster with
per-language surface urls; training-data curation wants the cluster id to
sample one language per document family (temperature mixing already works
per source — this gives it the page-family key).

Parsing contract (documented subset, oracle-mirrored):
* ``<link ... rel="alternate" ... hreflang="L" ... href="H" ...>`` with the
  three attributes in ANY order inside the tag, double quotes;
* L is a BCP-47-ish tag ``[a-z]{2}(-[A-Za-z]{2})?`` (``x-default`` also
  accepted); H is any non-empty double-quoted href;
* self-references (href == the page's own url) are kept as lang labels but
  create no edge.

Output: (cluster, url, lang) — cluster = lexicographic min url of the
connected component of the mutual-alternate graph; ``lang`` is the label
the CLUSTER declares for that url (min tag if pages disagree), '' when the
url is only ever a target with no declared tag.

100 TB shape: the extraction is one JVM regex projection per page (zero
python); edges are (url, href) pairs — |alternate-links|-sized, orders
smaller than the corpus — and the component step reuses
operators/canonicalize.connected_components (driver union-find below the
size threshold, min-label propagation with path compression above it).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .canonicalize import connected_components

# one regex per attribute, applied to each extracted <link ...> tag — this is
# what makes attribute order irrelevant without a combinatorial pattern
_LINK_TAG_RE = r"(?i)<link\b[^>]*>"
_REL_ALT_RE = r'(?i)\brel="alternate"'
_HREFLANG_RE = r'\bhreflang="([a-z]{2}(?:-[A-Za-z]{2})?|x-default)"'
_HREF_RE = r'\bhref="([^"]+)"'


def extract_hreflang_links(
    pages: DataFrame, url_col: str = "url", html_col: str = "html"
) -> DataFrame:
    """(url, href, lang) per rel=alternate hreflang declaration."""
    html_str = F.col(html_col).cast("string")
    tags = F.regexp_extract_all(html_str, F.lit(_LINK_TAG_RE), F.lit(0))
    rows = pages.select(
        F.col(url_col).alias("url"), F.explode(tags).alias("tag")
    ).filter(F.col("tag").rlike(_REL_ALT_RE))
    href = F.regexp_extract(F.col("tag"), _HREF_RE, 1)
    lang = F.regexp_extract(F.col("tag"), _HREFLANG_RE, 1)
    return (
        rows.select("url", href.alias("href"), lang.alias("lang"))
        .filter((F.col("href") != "") & (F.col("lang") != ""))
        .distinct()
    )


def hreflang_clusters(
    pages: DataFrame, url_col: str = "url", html_col: str = "html"
) -> DataFrame:
    """(cluster, url, lang) — see module contract."""
    links = extract_hreflang_links(pages, url_col, html_col)
    edges = (
        links.filter(F.col("url") != F.col("href"))
        .select(F.col("url").alias("a"), F.col("href").alias("b"))
        .distinct()
    )
    comp = connected_components(edges)  # (alias, component)
    members = comp.select(
        F.col("component").alias("cluster"), F.col("alias").alias("url")
    )
    # the lang a cluster declares for each target url (min on disagreement)
    declared = links.groupBy(F.col("href").alias("url")).agg(
        F.min("lang").alias("lang")
    )
    return members.join(declared, "url", "left").select(
        "cluster", "url", F.coalesce("lang", F.lit("")).alias("lang")
    )
