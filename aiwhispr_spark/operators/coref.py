"""Pronoun-coreference triple resolution (rule-based, window-scoped) with a
negation guard — precision/recall depth for the E3 extraction tier.

The base SVO kernel (aiwhispr_spark/triples.py, byte-compat with the
reference's pattern extractor) only emits triples whose subject is an
explicit surface form; web prose overwhelmingly continues "Acme Corp
acquired Beta. **It** is based in Berlin." — the second fact is lost
without coreference.  This operator resolves subject pronouns to the
NEAREST PRECEDING explicit subject within the same chunk (the classic
rule-based recency heuristic), and drops negated assertions ("was never
based in") that a naive pattern would emit as positive facts.

Contract (documented subset, unit-pinned):
* sentences split on whitespace after [.!?] (the T5 kernel's separator);
* an explicit ANCHOR subject is a capitalized token sequence immediately
  followed by a known verb phrase; pronouns never anchor;
* a PRONOUN fact is It/He/She/They + {acquired, is/was based in, is/was
  founded by}, object = the remainder up to the sentence period;
* a fact whose verb carries not/never is negated → dropped (guard is
  load-bearing: the based_in/founded_by patterns deliberately match the
  negated form so the guard, not the regex, rejects it);
* resolution looks at STRICTLY PRECEDING sentences (rowsBetween
  unboundedPreceding, -1); unresolvable pronouns drop (no hallucinated
  subjects).

100 TB shape: sentence explode + regex extraction are one narrow JVM
projection; the only shuffle is the per-chunk window (partitioned by the
chunk id — never global), whose state is one doc's sentence list.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_PRONOUNS = ("It", "He", "She", "They")
_ANCHOR_RE = (
    r"^([A-Z][A-Za-z0-9_]*(?: [A-Z][A-Za-z0-9_]*)*) "
    r"(?:acquired|is based in|was founded by|works for)\b"
)
_ACQ_RE = r"\bacquired ([A-Za-z0-9_ ]+)\.$"
_ACQ_NEG_RE = r"\b(?:not|never) acquired\b"
_BASED_RE = r"\b(?:is|was)( not| never)? based in ([A-Za-z0-9_ ]+)\.$"
_FOUNDED_RE = r"\b(?:is|was)( not| never)? founded by ([A-Za-z0-9_ ]+)\.$"


def pronoun_resolved_triples(
    chunks: DataFrame,
    text_col: str = "text_chunk",
    id_col: str = "url",
) -> DataFrame:
    """(url, sent_no, subj, pred, obj) — triples whose subject pronoun was
    resolved to the nearest preceding explicit subject (see module
    contract)."""
    sents = chunks.select(
        F.col(id_col).alias("url"),
        F.posexplode(
            F.split(F.col(text_col), r"(?<=[.!?])\s+")
        ).alias("sent_no", "sent"),
    )
    anchor_raw = F.regexp_extract("sent", _ANCHOR_RE, 1)
    anchor = F.when(
        (anchor_raw != "") & ~anchor_raw.isin(*_PRONOUNS), anchor_raw
    )
    pron = F.regexp_extract("sent", r"^(It|He|She|They)\b", 1)
    m_acq = F.regexp_extract("sent", _ACQ_RE, 1)
    based_neg = F.regexp_extract("sent", _BASED_RE, 1)
    m_based = F.regexp_extract("sent", _BASED_RE, 2)
    founded_neg = F.regexp_extract("sent", _FOUNDED_RE, 1)
    m_founded = F.regexp_extract("sent", _FOUNDED_RE, 2)
    fact = (
        F.when(
            (m_acq != "") & ~F.col("sent").rlike(_ACQ_NEG_RE),
            F.struct(F.lit("acquired").alias("pred"), m_acq.alias("obj")),
        )
        .when(
            (m_based != "") & (based_neg == ""),
            F.struct(F.lit("based_in").alias("pred"), m_based.alias("obj")),
        )
        .when(
            (m_founded != "") & (founded_neg == ""),
            F.struct(F.lit("founded_by").alias("pred"), m_founded.alias("obj")),
        )
    )
    staged = sents.select(
        "url", "sent_no", anchor.alias("anchor"), pron.alias("pron"), fact.alias("fact")
    )
    w = (
        Window.partitionBy("url")
        .orderBy("sent_no")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    resolved = staged.withColumn(
        "subj", F.last("anchor", ignorenulls=True).over(w)
    )
    return resolved.where(
        (F.col("pron") != "")
        & F.col("fact").isNotNull()
        & F.col("subj").isNotNull()
    ).select(
        "url",
        "sent_no",
        "subj",
        F.col("fact.pred").alias("pred"),
        F.col("fact.obj").alias("obj"),
    )
