"""Pagination-chain stitching: reassemble multi-page articles declared via
``<link rel="next" href="...">`` into ordered series — the page-level twin
of document reassembly (operators/qa.py::G3 works on chunk_no within one
doc; this first has to DISCOVER the order by following next-pointers
across documents).

Semantics (oracle-mirrored):
* the FIRST rel=next link tag per page wins (attributes in any order,
  double quotes); self-references are dropped;
* two pages claiming the same next target break the chain at the target —
  the lexicographically-min claimant keeps it (documented election, the
  urlnorm max_by discipline);
* every page gets (series, page_no): series = the chain head's url,
  page_no = 1-based position; pages in no chain (and pages whose chain is
  cyclic or longer than ``max_chain``) are singleton series of themselves;
* ``reassemble_series`` concatenates texts in page order.

100 TB shape: extraction is one narrow JVM regex projection; the
next-graph is |next-links|-sized (orders below the corpus) and resolves
via pointer HALVING (operators/redirects.py — log2(max_chain) self-joins,
never per-hop walks) run on the REVERSED edges so every page points at
its head; reassembly is ONE groupBy keyed on the series where each row
carries (page_no, url, text) once — the same single-exchange shape as G1
QA assembly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .redirects import resolve_redirects

_LINK_TAG_RE = r"(?i)<link\b[^>]*>"
_REL_NEXT_RE = r'(?i)\brel="next"'
_HREF_RE = r'\bhref="([^"]+)"'


def extract_next_links(
    pages: DataFrame, url_col: str = "url", html_col: str = "html"
) -> DataFrame:
    """(url, next_url) — the first rel=next declaration per page."""
    html_str = F.col(html_col).cast("string")
    tags = F.filter(
        F.regexp_extract_all(html_str, F.lit(_LINK_TAG_RE), F.lit(0)),
        lambda tag: tag.rlike(_REL_NEXT_RE) & (F.regexp_extract(tag, _HREF_RE, 1) != ""),
    )
    # F.get, not element_at: ANSI mode (session default) makes element_at
    # RAISE on the empty tag array; get is NULL-safe
    first = F.get(tags, 0)
    return (
        pages.select(
            F.col(url_col).alias("url"),
            F.regexp_extract(first, _HREF_RE, 1).alias("next_url"),
        )
        .where(F.col("next_url").isNotNull() & (F.col("next_url") != ""))
        .where(F.col("next_url") != F.col("url"))
    )


def stitch_pagination(
    pages: DataFrame,
    url_col: str = "url",
    html_col: str = "html",
    text_col: str = "text",
    max_chain: int = 64,
) -> DataFrame:
    """(url, text, series, page_no) for every page (see module contract)."""
    links = extract_next_links(pages, url_col, html_col)
    # reversed: each page points at its PREDECESSOR; min-claimant election
    # makes the map functional before the halving (which would raise)
    rev = links.groupBy(F.col("next_url").alias("src")).agg(
        F.min("url").alias("dst")
    )
    resolved = resolve_redirects(rev, max_chain=max_chain)
    return (
        pages.select(F.col(url_col).alias("url"), F.col(text_col).alias("text"))
        .join(resolved.withColumnRenamed("src", "url"), "url", "left")
        .select(
            "url",
            "text",
            F.when(F.col("cyc_i") == 0, F.col("final"))
            .otherwise(F.col("url"))
            .alias("series"),
            F.when(F.col("cyc_i") == 0, F.col("hops_i") + 1)
            .otherwise(F.lit(1))
            .cast("long")
            .alias("page_no"),
        )
        # a NULL cyc_i (page with no predecessor chain) falls through both
        # whens' otherwise branches -> singleton (url, 1) with no extra pass
    )


def reassemble_series(stitched: DataFrame, sep: str = "\n") -> DataFrame:
    """(series, n_pages, page_urls, full_text) — one row per series with
    pages concatenated in page_no order (url tie-break)."""
    ordered = F.array_sort(
        F.collect_list(F.struct(F.col("page_no"), F.col("url"), F.col("text")))
    )
    return (
        stitched.groupBy("series")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_pages"),
            ordered.alias("_ord"),
        )
        .select(
            "series",
            "n_pages",
            F.concat_ws(",", F.transform(F.col("_ord"), lambda s: s["url"])).alias(
                "page_urls"
            ),
            F.concat_ws(sep, F.transform(F.col("_ord"), lambda s: s["text"])).alias(
                "full_text"
            ),
        )
    )
