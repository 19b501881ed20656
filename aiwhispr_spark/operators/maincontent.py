"""Main-content extraction by per-block link density — the trafilatura/
boilerpipe family's core heuristic, expressed as pure JVM column work.

Navigation chrome, footers, and link farms are blocks whose visible text is
mostly anchor text; article prose is blocks whose text is mostly outside
``<a>`` tags.  Dropping high-link-density blocks BEFORE the T1 tag strip is
the standard web-curation step the flat reference kernel (T1 strips tags but
keeps nav text) doesn't have.

The decision unit is the closed BLOCK element (``</p> </li> </div> </hN>
</td> </tr> <br>`` boundaries), not the physical line: pretty-printed
templates put anchor text on its own lines, so line-based density would
count multi-line nav anchors as prose — newlines are normalized to spaces
first, which also makes anchor spans single-line by construction (no DOTALL
needed; anchors never span a closed block in well-formed HTML).

Density discipline: computed on integer char counts (visible chars, anchor
chars) and compared as ``anchor_chars · 100 > threshold_pct · visible_chars``
— integer cross-multiplication, no float division, so the Spark and DuckDB
decisions are exactly equal and the downstream md5 gate is byte-stable.

100 TB shape: one narrow projection (normalize → split → transform → filter
→ rejoin, all JVM array expressions inside whole-stage codegen), zero
shuffle, no python stage.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# public: the oracle SQL interpolates these verbatim (Java ≡ RE2 subset)
TAG_RE = r"<[^>]*>"
ANCHOR_SPAN_RE = r"(?i)<a(\s[^>]*)?>.*?</a>"
BLOCK_SPLIT_RE = r"(?i)</p\s*>|</li\s*>|</div\s*>|</h[1-6]\s*>|</td\s*>|</tr\s*>|<br\s*/?\s*>"
NEWLINE_RE = r"[\n\r]+"


def _visible(block: Column) -> Column:
    return F.regexp_replace(block, TAG_RE, "")


def _anchor_len(block: Column) -> Column:
    # visible chars that sit inside <a>…</a> spans = visible(block) minus
    # visible(block with anchor spans deleted)
    return F.length(_visible(block)) - F.length(
        F.regexp_replace(F.regexp_replace(block, ANCHOR_SPAN_RE, ""), TAG_RE, "")
    )


def block_link_density(html_text: Column) -> Column:
    """array<struct<block, visible, anchored>> — per-block audit counts over
    the newline-normalized, block-split document."""
    return F.transform(
        F.split(F.regexp_replace(html_text, NEWLINE_RE, " "), BLOCK_SPLIT_RE),
        lambda b: F.struct(
            b.alias("block"),
            F.length(_visible(b)).cast("long").alias("visible"),
            _anchor_len(b).cast("long").alias("anchored"),
        ),
    )


def keep_block(s: Column, max_link_pct: int) -> Column:
    """The density decision: some non-whitespace visible text AND anchor
    share ≤ ``max_link_pct`` percent (integer cross-multiplied)."""
    return (F.length(F.trim(_visible(s["block"]))) > 0) & (
        s["anchored"] * 100 <= F.lit(max_link_pct) * s["visible"]
    )


def main_content_expr(html_text: Column, max_link_pct: int = 50) -> Column:
    """The T1-ready html with chrome blocks removed: keeps blocks with some
    visible text whose anchor-char share is ≤ ``max_link_pct`` percent,
    rejoined with ``\\n`` in order.  Run BEFORE the T1 tag strip."""
    kept = F.filter(
        block_link_density(html_text), lambda s: keep_block(s, max_link_pct)
    )
    return F.array_join(F.transform(kept, lambda s: s["block"]), "\n")


# soft-404 marker phrases, documented subset (lowercase match targets; the
# oracle mirrors the same alternation verbatim)
_SOFT404_RE = (
    r"(page not found|404 error|error 404|does not exist"
    r"|no longer available|page you requested)"
)


def soft404_signals(
    docs: DataFrame,
    url_col: str = "url",
    html_col: str = "html",
    max_len: int = 500,
) -> DataFrame:
    """Soft-404 detection: pages that return HTTP 200 but are really error
    shells — the crawl artifact that poisons both the corpus (thousands of
    identical "not found" documents) and the link graph (dead targets that
    look alive).  A page flags when BOTH hold:

    * its ``<title>`` or visible text contains a marker phrase
      (documented alternation above, case-insensitive), and
    * its visible text is short (< ``max_len`` chars) — real articles that
      merely MENTION a 404 stay in the corpus.

    Output: (url, title, n_chars, has_marker_i, is_soft404_i) — the signals
    stay visible so a curation plan can threshold differently.

    100 TB shape: title pull + crude tag strip + one rlike, all narrow JVM
    expressions fused with the page scan; the filter composes with the
    curation chain the same way robots_noindex does.
    """
    text = F.decode(F.col(html_col), "UTF-8")
    title = F.trim(
        F.regexp_extract(text, r"(?s)<title[^>]*>(.*?)</title>", 1)
    )
    visible = F.trim(
        F.regexp_replace(
            F.regexp_replace(text, r"(?s)<[^>]*>", " "), r"\s+", " "
        )
    )
    has_marker = F.lower(title).rlike(_SOFT404_RE) | F.lower(visible).rlike(
        _SOFT404_RE
    )
    n_chars = F.length(visible).cast("long")
    return docs.select(
        F.col(url_col).alias("url"),
        title.alias("title"),
        n_chars.alias("n_chars"),
        has_marker.cast("int").alias("has_marker_i"),
        (has_marker & (n_chars < max_len)).cast("int").alias("is_soft404_i"),
    )
