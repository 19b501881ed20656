"""MediaWiki XML dump scan → wikitext extraction (infobox triples + the
internal link graph) — the DBpedia-style KG source: encyclopedia dumps are
the canonical high-precision seed next to the open-web WARC tier.

Spark-first dump reading: a dump is ONE huge XML file, but `spark.read.text`
with ``lineSep = "</page>"`` makes it SPLITTABLE — each task gets whole
page blocks (the delimiter is the page terminator, so no page straddles a
record), which is the standard trick for scan-parallelizing single-file
XML dumps without an XML package.  All field pulls are JVM regex / array
expressions (no python stage), the same discipline as the StackExchange /
feed / sitemap scans.

Parsing contract (documented subset, unit-pinned; oracles stay independent
by rebuilding expected rows from the fixture's closed form):
* page title  = first ``<title>…</title>`` inner text, XML-unescaped;
* body        = first ``(?s)<text…>…</text>`` inner text, XML-unescaped
  (escapes decode AFTER extraction, so ``&lt;`` in prose can't truncate);
* infobox     = first ``{{Infobox <type>`` block up to the first line that
  is exactly ``}}``; params are ``| key = value`` LINES (the dominant dump
  layout); values keep inner spaces, trim outer;
* links       = every ``[[Target]]`` / ``[[Target|label]]``; section
  anchors (``Target#sec``) keep the page part only.
* XML unescape order: &lt; &gt; &quot; &#39; first, &amp; LAST (the inverse
  of escaping order — mandatory or ``&amp;lt;`` double-decodes).

100 TB shape: the scan is delimiter-splittable; extraction is one narrow
projection per page; the triple/link outputs co-partition with the rest of
the KG build by subject key.  Revision history dumps (multiple <revision>
per page) should be pre-filtered to latest-revision dumps — this reader
takes the FIRST revision text block per page (current-pages dumps carry
exactly one).
"""

from __future__ import annotations

import datetime as _dt
import os

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

_TITLE_RE = r"(?s)<title>([^<]*)</title>"
_TEXT_RE = r"(?s)<text[^>]*>(.*?)</text>"
_INFOBOX_RE = r"(?s)\{\{Infobox ([^\n|{}]+?)\s*\n(.*?)\n\}\}"
# horizontal whitespace ONLY around '=' — \s would eat the newline of an
# empty-valued param and swallow the following '| key = …' line whole
_PARAM_RE = r"(?m)^\|[ \t]*([A-Za-z][A-Za-z0-9_]*)[ \t]*=[ \t]*(.*?)[ \t]*$"
_LINK_RE = r"\[\[([^\]|#]+)(?:#[^\]|]*)?(?:\|[^\]]*)?\]\]"


def xml_unescape_expr(col: Column) -> Column:
    """Minimal XML entity decode — &lt; &gt; &quot; &#39;/&apos; first,
    &amp; LAST (module contract)."""
    out = col
    for ent, ch in (
        ("&lt;", "<"),
        ("&gt;", ">"),
        ("&quot;", '"'),
        ("&#39;", "'"),
        ("&apos;", "'"),
        ("&amp;", "&"),
    ):
        out = F.replace(out, F.lit(ent), F.lit(ch))
    return out


def read_mediawiki_pages(spark: SparkSession, path: str) -> DataFrame:
    """(title, body) — one row per ``<page>`` of a MediaWiki XML dump,
    title and wikitext body XML-unescaped.  Splittable via the
    ``lineSep='</page>'`` text scan (module docstring)."""
    raw = spark.read.option("lineSep", "</page>").text(path)
    pages = raw.filter(F.col("value").contains("<title>"))
    return pages.select(
        xml_unescape_expr(F.regexp_extract("value", _TITLE_RE, 1)).alias("title"),
        xml_unescape_expr(F.regexp_extract("value", _TEXT_RE, 1)).alias("body"),
    ).filter(F.col("title") != "")


def infobox_triples(pages: DataFrame) -> DataFrame:
    """(subj, pred, obj) from the first infobox per page: one
    ``wiki:type`` → lowercased infobox type row plus one
    ``infobox:<key>`` → value row per parameter line."""
    withbox = pages.select(
        "title",
        F.lower(F.trim(F.regexp_extract("body", _INFOBOX_RE, 1))).alias("btype"),
        F.regexp_extract("body", _INFOBOX_RE, 2).alias("blob"),
    ).filter(F.col("btype") != "")
    typed = withbox.select(
        F.col("title").alias("subj"),
        F.lit("wiki:type").alias("pred"),
        F.col("btype").alias("obj"),
    )
    keys = F.regexp_extract_all("blob", F.lit(_PARAM_RE), F.lit(1))
    vals = F.regexp_extract_all("blob", F.lit(_PARAM_RE), F.lit(2))
    params = (
        withbox.select(
            "title", F.explode(F.arrays_zip(keys.alias("k"), vals.alias("v"))).alias("p")
        )
        .filter(F.col("p.v") != "")
        .select(
            F.col("title").alias("subj"),
            F.concat(F.lit("infobox:"), F.col("p.k")).alias("pred"),
            F.col("p.v").alias("obj"),
        )
    )
    return typed.unionByName(params)


def internal_links(pages: DataFrame) -> DataFrame:
    """(src_title, dst_title) — every internal wiki link, label and section
    anchor stripped, duplicates kept (callers aggregate)."""
    return pages.select(
        F.col("title").alias("src_title"),
        F.explode(F.regexp_extract_all("body", F.lit(_LINK_RE), F.lit(1))).alias(
            "dst_title"
        ),
    ).select("src_title", F.trim("dst_title").alias("dst_title"))


# ---------------------------------------------------------------------------
# deterministic fixture (closed form from the page index — oracles rebuild
# expected rows from the same arithmetic, independent of every regex above)


def make_page_xml(i: int, n_pages: int = 120) -> str:
    e = i % 40
    amp = " &amp; Co" if i % 10 == 0 else ""
    link = (i * 7 + 3) % n_pages
    return (
        "  <page>\n"
        f"    <title>Article {i}</title>\n"
        "    <ns>0</ns>\n"
        f"    <id>{i + 1}</id>\n"
        "    <revision>\n"
        f"      <timestamp>{(_dt.datetime(2023, 1, 1) + _dt.timedelta(hours=i)).isoformat()}Z</timestamp>\n"
        '      <text bytes="300" xml:space="preserve">{{Infobox company\n'
        f"| name = Entity {e}{amp}\n"
        f"| founded = {1980 + i % 35}\n"
        f"| hq = City{i % 9}\n"
        "}}\n"
        f"'''Entity {e}''' is a company. See [[Article {link}|related]] "
        f"and [[Article {(link + 1) % n_pages}#History]].\n"
        "</text>\n"
        "    </revision>\n"
        "  </page>\n"
    )


def write_mediawiki_dump(path: str, n_pages: int = 120) -> str:
    """One-file MediaWiki current-pages dump with the standard siteinfo
    header — the single-file shape the lineSep scan must split."""
    parts = [
        '<mediawiki xmlns="http://www.mediawiki.org/xml/export-0.10/" version="0.10">\n',
        "  <siteinfo>\n    <sitename>SynthWiki</sitename>\n  </siteinfo>\n",
    ]
    parts += [make_page_xml(i, n_pages) for i in range(n_pages)]
    parts.append("</mediawiki>\n")
    tmp = path + ".tmp"
    with open(tmp, "w", encoding="utf-8") as f:
        f.write("".join(parts))
    os.replace(tmp, path)
    return path
