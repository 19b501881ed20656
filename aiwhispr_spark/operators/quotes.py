"""Quotation attribution: mine (speaker, said, quote) facts from prose.

The reference's extraction tier stops at SVO patterns over declarative
sentences (`python/textprocessor` in prasaar/aiwhispr); news-like web text
carries a second, high-precision fact channel — direct quotations with an
explicit attribution verb.  Production KGs treat "X said Q" as a
provenance-bearing assertion edge, so a crawl-scale KG engine wants it as a
first-class triple source alongside SVO / structured-markup mining.

Contract (documented subset, unit-pinned and mirrored by the oracle):
* TRAILING attribution: ``"<quote>," said <Speaker>`` — the quote ends with
  a comma INSIDE the closing quote mark (the journalistic convention);
* LEADING attribution: ``<Speaker> said, "<quote>"``;
* a Speaker is a capitalized token sequence (``Acme Corp`` qualifies);
  bare pronouns (It/He/She/They) never attribute — a quote whose only
  speaker evidence is a pronoun is dropped, not hallucinated (the
  coref-resolution tier owns pronouns, see operators/coref.py);
* quotes are emitted verbatim (no trailing-punctuation strip), one row per
  (occurrence), duplicates preserved.

100 TB shape: both arms are regexp_extract_all projections over the SAME
chunk scan, zipped and concatenated into ONE array before the explode — a
single narrow JVM stage fused with the scan, zero shuffle, zero python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_PRONOUNS = ("It", "He", "She", "They")
_SPEAKER = r"[A-Z][A-Za-z0-9_]*(?: [A-Z][A-Za-z0-9_]*)*"
_TRAILING_RE = rf'"([^"]{{1,500}})," said ({_SPEAKER})'
_LEADING_RE = rf'({_SPEAKER}) said, "([^"]{{1,500}})"'


def extract_quotes(
    chunks: DataFrame,
    text_col: str = "text_chunk",
    id_col: str = "url",
) -> DataFrame:
    """(url, speaker, quote, arm) — one row per attributed quotation;
    arm ∈ {trailing, leading} names the matching convention."""
    text = F.col(text_col)

    def _pairs(pattern: str, speaker_grp: int, quote_grp: int, arm: str):
        speakers = F.regexp_extract_all(text, F.lit(pattern), F.lit(speaker_grp))
        qs = F.regexp_extract_all(text, F.lit(pattern), F.lit(quote_grp))
        return F.zip_with(
            speakers,
            qs,
            lambda s, t: F.struct(
                s.alias("speaker"), t.alias("quote"), F.lit(arm).alias("arm")
            ),
        )

    both = F.concat(
        _pairs(_TRAILING_RE, 2, 1, "trailing"),
        _pairs(_LEADING_RE, 1, 2, "leading"),
    )
    return (
        chunks.select(F.col(id_col).alias("url"), F.explode(both).alias("m"))
        .select(
            "url",
            F.col("m.speaker").alias("speaker"),
            F.col("m.quote").alias("quote"),
            F.col("m.arm").alias("arm"),
        )
        .where(~F.col("speaker").isin(*_PRONOUNS))
    )


_ACCORDING_RE = rf"According to ({_SPEAKER}), ([^.!?]{{1,300}})[.!?]"


def extract_attributions(
    chunks: DataFrame,
    text_col: str = "text_chunk",
    id_col: str = "url",
) -> DataFrame:
    """(url, source, claim) — indirect source attribution: "According to
    <Source>, <claim>." sentences, the unquoted counterpart of
    :func:`extract_quotes` (claims a KG should store WITH their asserting
    source, feeding temporal.source_reliability's per-source trust).

    Documented subset: sentence-initial frame, source is a capitalized
    mention run, claim runs to the first sentence ender (so it can never
    swallow a following sentence); pronoun sources are dropped like the
    quote arms.

    100 TB shape: one regexp_extract_all pair zipped by index — the quotes
    discipline, zero shuffle, zero python.
    """
    text = F.col(text_col)
    sources = F.regexp_extract_all(text, F.lit(_ACCORDING_RE), F.lit(1))
    claims = F.regexp_extract_all(text, F.lit(_ACCORDING_RE), F.lit(2))
    pairs = F.zip_with(
        sources,
        claims,
        lambda s, c: F.struct(s.alias("source"), c.alias("claim")),
    )
    return (
        chunks.select(F.col(id_col).alias("url"), F.explode(pairs).alias("m"))
        .select("url", F.col("m.source").alias("source"), F.col("m.claim").alias("claim"))
        .where(~F.col("source").isin(*_PRONOUNS))
    )
