"""Main-content extraction by per-line link density — the trafilatura/
boilerpipe family's core heuristic, expressed as pure JVM column work.

Navigation chrome, footers, and link farms are lines whose visible text is
mostly anchor text; article prose is lines whose text is mostly outside
``<a>`` tags.  Dropping high-link-density lines BEFORE the T1 tag strip is
the standard web-curation step the flat reference kernel (T1 strips tags but
keeps nav text) doesn't have.

Density discipline: computed on integer char counts (visible chars, anchor
chars) and compared as ``anchor_chars · 100 > threshold_pct · visible_chars``
— integer cross-multiplication, no float division, so the Spark and DuckDB
decisions are exactly equal and the downstream md5 gate is byte-stable.

100 TB shape: one narrow projection (split → transform → filter → rejoin,
all JVM array expressions inside whole-stage codegen), zero shuffle, no
python stage.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_TAG_RE = r"<[^>]*>"
_ANCHOR_SPAN_RE = r"<a(\s[^>]*)?>.*?</a>"


def _visible_len(line: Column) -> Column:
    return F.length(F.regexp_replace(line, _TAG_RE, ""))


def _anchor_len(line: Column) -> Column:
    # visible chars that sit inside <a>…</a> spans = visible(line) minus
    # visible(line with anchor spans deleted)
    return _visible_len(line) - F.length(
        F.regexp_replace(F.regexp_replace(line, _ANCHOR_SPAN_RE, ""), _TAG_RE, "")
    )


def line_link_density(html_text: Column) -> Column:
    """array<struct<line, visible, anchored>> — per-line audit counts."""
    return F.transform(
        F.split(html_text, "\n"),
        lambda ln: F.struct(
            ln.alias("line"),
            _visible_len(ln).cast("long").alias("visible"),
            _anchor_len(ln).cast("long").alias("anchored"),
        ),
    )


def main_content_expr(html_text: Column, max_link_pct: int = 50) -> Column:
    """The T1-ready html with chrome lines removed: keeps lines with some
    visible text whose anchor-char share is ≤ ``max_link_pct`` percent,
    rejoined with ``\\n`` in order.  Run BEFORE the T1 tag strip."""
    kept = F.filter(
        line_link_density(html_text),
        lambda s: (s["visible"] > 0)
        & (s["anchored"] * 100 <= F.lit(max_link_pct) * s["visible"]),
    )
    return F.array_join(F.transform(kept, lambda s: s["line"]), "\n")
