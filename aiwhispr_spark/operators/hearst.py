"""Hearst-pattern hypernym mining (Hearst, COLING '92): ``is_a`` triples
from lexico-syntactic patterns over prose — the taxonomy-from-text stage
that complements the breadcrumb taxonomy (structured navigation) and the
SVO "X is a Y" arm (aiwhispr_spark/triples.py, which needs BOTH sides
capitalized; Hearst classes are common nouns).

Documented pattern subset (oracle-mirrored):
* ``<class> such as <M1>, <M2>, and <M3>`` — every listed mention is_a
  class (list = 1+ mentions, comma-separated, optional ``and``/``or``
  final conjunction with or without the Oxford comma);
* ``<M1>, <M2> and other <class>`` — same list shape, class follows.

A mention is a capitalized token run (the triples.py shape); the class is
the single word immediately before ``such as`` / after ``and other``,
lowercased in the output.  Multi-word mentions survive the list split
because the split keys on the comma/conjunction tokens, never on spaces.

100 TB shape: two regex projections over the SAME chunk scan concat into
one array before the explode — a single narrow JVM stage, zero shuffle,
zero python (the quantity-literal discipline, operators/literals.py).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# the triples.py mention shape (capitalized run, numeric continuations)
_M = r"(?:[A-Z][A-Za-z0-9_]*)(?: (?:[A-Z][A-Za-z0-9_]*|[0-9]+))*"
_LIST = rf"({_M}(?:, {_M})*(?:,? (?:and|or) {_M})?)"
_SUCH_AS_RE = rf"([A-Za-z]+) such as {_LIST}"
_AND_OTHER_RE = rf"{_LIST} and other ([A-Za-z]+)"
# list separators: ', ' and the final ',? and/or ' conjunction
_SPLIT_RE = r",?\s(?:and|or)\s|,\s"


def extract_hearst_hypernyms(
    chunks: DataFrame,
    text_col: str = "text_chunk",
    id_col: str = "url",
) -> DataFrame:
    """(url, subj, pred, obj, pattern) — one row per (instance, class) pair
    mined by the documented Hearst patterns; pred is always ``is_a``,
    obj is the lowercased class, pattern in {such_as, and_other}."""
    text = F.col(text_col)

    def _arm(pattern: str, cls_grp: int, list_grp: int, tag: str) -> Column:
        classes = F.regexp_extract_all(text, F.lit(pattern), F.lit(cls_grp))
        lists = F.regexp_extract_all(text, F.lit(pattern), F.lit(list_grp))
        zipped = F.arrays_zip(classes.alias("cls"), lists.alias("blob"))
        return F.transform(
            zipped,
            lambda s: F.struct(
                s["cls"].alias("cls"),
                F.split(s["blob"], _SPLIT_RE).alias("insts"),
                F.lit(tag).alias("pattern"),
            ),
        )

    arms = F.concat(
        _arm(_SUCH_AS_RE, 1, 2, "such_as"),
        _arm(_AND_OTHER_RE, 2, 1, "and_other"),
    )
    return (
        chunks.select(F.col(id_col).alias("url"), F.explode(arms).alias("m"))
        .select("url", F.col("m.cls").alias("cls"), F.col("m.pattern").alias("pattern"),
                F.explode("m.insts").alias("subj"))
        .select(
            "url",
            "subj",
            F.lit("is_a").alias("pred"),
            F.lower(F.col("cls")).alias("obj"),
            "pattern",
        )
    )


# appositive phrase: ", a|an <lowercase words>," right after a mention —
# "Acme Corp, a Berlin-based vendor, said …"
_APPOS_RE = rf"({_M}), an? ((?:[a-z][a-z\-]* )*[a-z][a-z\-]*),"


def extract_appositive_isa(
    chunks: DataFrame,
    text_col: str = "text_chunk",
    id_col: str = "url",
) -> DataFrame:
    """(url, subj, pred, obj, pattern) — ``is_a`` facts from APPOSITIVE
    noun phrases ("Acme Corp, a Berlin-based vendor, …"), the third
    prose taxonomy source next to the Hearst list patterns above and the
    capitalized-both-sides SVO arm (triples.py).  obj is the phrase's HEAD
    NOUN (last token — English appositives are head-final: 'Berlin-based
    vendor' is_a-classifies as 'vendor'); the full phrase is kept in
    ``phrase`` for consumers that want the modifiers.

    Documented subset (oracle-mirrored): the phrase is lowercase/hyphen
    words between ", a|an " and the CLOSING comma — an appositive without
    its closing comma (sentence-final) is out of scope, as are phrases
    containing capitalized words (those are usually coordination, not
    apposition).

    100 TB shape: same discipline as the Hearst arms — one narrow JVM regex
    projection over the chunk scan, zero shuffle, zero python.
    """
    text = F.col(text_col)
    subs = F.regexp_extract_all(text, F.lit(_APPOS_RE), F.lit(1))
    phrases = F.regexp_extract_all(text, F.lit(_APPOS_RE), F.lit(2))
    zipped = F.arrays_zip(subs.alias("subj"), phrases.alias("phrase"))
    return (
        chunks.select(F.col(id_col).alias("url"), F.explode(zipped).alias("m"))
        .select(
            "url",
            F.col("m.subj").alias("subj"),
            F.lit("is_a").alias("pred"),
            F.element_at(F.split(F.col("m.phrase"), " "), -1).alias("obj"),
            F.col("m.phrase").alias("phrase"),
            F.lit("appositive").alias("pattern"),
        )
    )


# copula predicate nominal: "<Mention> is/was/are/were [negation] a|an
# <lowercase phrase><clause-ending punctuation>" — the polarity-aware SVO
# sibling: "Acme is a vendor." asserts; "Acme is not a vendor." DENIES, and
# a pipeline that mines the positive form while ignoring negation emits the
# exact opposite of what the page said.
_COPULA_RE = (
    rf"({_M}) (?:is|was|are|were)( not| never| no longer|n't)?"
    r" an? ((?:[a-z][a-z\-]* )*[a-z][a-z\-]*)[.,;!?]"
)


def extract_copula_isa(
    chunks: DataFrame,
    text_col: str = "text_chunk",
    id_col: str = "url",
) -> DataFrame:
    """(url, subj, pred, obj, polarity, phrase) — ``is_a`` facts from copula
    sentences WITH NEGATION POLARITY: polarity='neg' rows are denials
    ("is not a", "isn't a", "was never a", "is no longer a") that a fact
    consumer must treat as refuting evidence, never as support (the
    truthfinder/fact-confidence ballots take polarity as input).

    Documented subset (oracle-mirrored): the predicate nominal is the
    lowercase/hyphen word run from the article to the CLAUSE-ENDING
    punctuation (. , ; ! ?) — head-final, obj = last token, same head rule
    as the appositive arm; a capitalized or punctuation-free predicate is
    out of scope (usually coordination or an unfinished clause).

    100 TB shape: one narrow JVM regex projection, zero shuffle, zero
    python — fuses into the chunk scan like the other prose-taxonomy arms.
    """
    text = F.col(text_col)
    subs = F.regexp_extract_all(text, F.lit(_COPULA_RE), F.lit(1))
    negs = F.regexp_extract_all(text, F.lit(_COPULA_RE), F.lit(2))
    phrases = F.regexp_extract_all(text, F.lit(_COPULA_RE), F.lit(3))
    zipped = F.arrays_zip(subs.alias("subj"), negs.alias("neg"), phrases.alias("phrase"))
    return (
        chunks.select(F.col(id_col).alias("url"), F.explode(zipped).alias("m"))
        .select(
            "url",
            F.col("m.subj").alias("subj"),
            F.lit("is_a").alias("pred"),
            F.element_at(F.split(F.col("m.phrase"), " "), -1).alias("obj"),
            F.when(F.trim(F.col("m.neg")) == "", F.lit("pos"))
            .otherwise(F.lit("neg"))
            .alias("polarity"),
            F.col("m.phrase").alias("phrase"),
        )
    )
