"""Unicode normalization — the first transform of every webtext pipeline
(crawled HTML mixes precomposed and combining-mark forms, fullwidth
compatibility characters, ligatures; unnormalized text silently breaks exact
dedup, token counting, and string joins downstream).

Spark has no built-in normalizer, so this is a legitimate python stage:
an Arrow-batched pandas UDF over ``unicodedata.normalize`` (UAX #15).  The
NFC arm is hash-gateable against DuckDB's ``nfc_normalize`` (utf8proc —
verified char-identical on combining marks, Hangul jamo, ligatures);
NFKC/NFD/NFKD are pytest-gated (DuckDB only ships NFC).

100 TB shape: narrow projection (scan → pandas UDF → project), no shuffle;
normalization cost is linear in bytes and rides the same stage as the scan.
Reference parity: the reference normalizes nothing explicitly — this is an
engine addition under SURVEY §2.8 (training-data pipeline tier).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

_FORMS = ("NFC", "NFKC", "NFD", "NFKD")


def normalize_udf(form: str = "NFC"):
    """Vectorized ``unicodedata.normalize(form, s)`` column function.
    NULL stays NULL (extraction failures remain visible)."""
    if form not in _FORMS:
        raise ValueError(f"form must be one of {_FORMS}, got {form!r}")

    @pandas_udf("string")
    def _norm(s: pd.Series) -> pd.Series:
        import unicodedata

        return s.map(
            lambda t: unicodedata.normalize(form, t) if t is not None else None
        )

    return _norm


def normalize_text(
    docs: DataFrame,
    text_col: str = "text",
    form: str = "NFC",
    out_col: str | None = None,
) -> DataFrame:
    """Replace (or add as ``out_col``) the normalized form of ``text_col``,
    plus a ``changed_i`` flag (1 where normalization altered the string —
    the ingest metric worth tracking: a spike means a new source ships
    decomposed text)."""
    out = out_col or text_col
    tmp = "__nfc_tmp"
    with_norm = docs.withColumn(tmp, normalize_udf(form)(F.col(text_col)))
    with_flag = with_norm.withColumn(
        "changed_i",
        F.when(F.col(text_col).isNull(), F.lit(None).cast("int")).otherwise(
            (F.col(tmp) != F.col(text_col)).cast("int")
        ),
    )
    return with_flag.withColumn(out, F.col(tmp)).drop(tmp)


# UTS #39-style confusable map, documented reduced subset: the Cyrillic and
# Greek letters that render identically to Latin in common fonts (the
# IDN-homograph / wiki-vandalism alphabet).  Kept as two parallel strings
# for translate() — ONE source of truth, mirrored verbatim by the oracle.
CONFUSABLE_FROM = (
    "аеорсухіѕјԛԝ"  # Cyrillic lowercase
    "АВЕКМНОРСТУХЅІЈ"  # Cyrillic uppercase
    "ον"  # Greek lowercase
    "ΑΒΕΖΗΙΚΜΝΟΡΤΥΧ"  # Greek uppercase
)
CONFUSABLE_TO = "aeopcyxisjqw" "ABEKMHOPCTYXSIJ" "ov" "ABEZHIKMNOPTYX"


def confusable_skeleton_expr(col: Column) -> Column:
    """Spoof-detection skeleton: lookalike letters folded to their Latin
    targets, then lowercased (translate BEFORE lower so uppercase Cyrillic
    maps through its Latin capital).  Input is assumed NFC — compose with
    :func:`normalize_text` upstream; the skeleton itself stays a pure JVM
    expression so both engines run it byte-identically."""
    return F.lower(F.translate(col, CONFUSABLE_FROM, CONFUSABLE_TO))


def homograph_pairs(
    names: DataFrame,
    name_col: str = "name",
) -> DataFrame:
    """IDN-homograph / lookalike-alias detection: DISTINCT names that
    collapse to the SAME confusable skeleton while differing as raw strings
    — the security-hygiene pass a web-scale entity store runs before
    trusting surface forms ("аcme.example" with a Cyrillic а must not merge
    silently with — or impersonate — "acme.example").

    Output: (a, b, skeleton, a_ascii_i, b_ascii_i, is_spoof_i) with a < b
    (byte order, identical in both engines); ``is_spoof_i`` = 1 when
    exactly one side is pure ASCII — the classic impersonation shape.
    Same-script non-ASCII pairs still emit (reviewable), flagged 0.

    100 TB shape: one distinct on the name, one skeleton groupBy key, and a
    skeleton-keyed self-join whose fan-out is the homograph family size —
    bounded by the alphabet being abused, not the corpus.  Zero python.
    """
    ascii_i = F.col("name").rlike(r"^[\x00-\x7f]*$").cast("int")
    keyed = names.select(F.col(name_col).alias("name")).distinct().select(
        "name",
        confusable_skeleton_expr(F.col("name")).alias("skeleton"),
        ascii_i.alias("ascii_i"),
    )
    l = keyed.select(
        F.col("name").alias("a"),
        "skeleton",
        F.col("ascii_i").alias("a_ascii_i"),
    )
    r = keyed.select(
        F.col("name").alias("b"),
        "skeleton",
        F.col("ascii_i").alias("b_ascii_i"),
    )
    return (
        l.join(r, "skeleton")
        .filter(F.col("a") < F.col("b"))
        .select(
            "a",
            "b",
            "skeleton",
            "a_ascii_i",
            "b_ascii_i",
            (F.col("a_ascii_i") != F.col("b_ascii_i")).cast("int").alias("is_spoof_i"),
        )
    )


# Latin typographic ligatures (U+FB00-FB06) → ASCII expansions.  NFC does
# NOT decompose these (they are compatibility, not canonical, equivalents);
# NFKC would, but it also mangles ²/½/㎒ — extraction pipelines want ONLY
# the ligature subset, hence the explicit map.
_LIGATURES = {
    "ﬀ": "ff",
    "ﬁ": "fi",
    "ﬂ": "fl",
    "ﬃ": "ffi",
    "ﬄ": "ffl",
    "ﬅ": "st",  # ſt (long-s t)
    "ﬆ": "st",
}


def pdf_text_cleanup(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Extracted-text cleanup for the PDF/OCR arm (docproc U5 output):

    1. expand Latin ligatures (ﬁ → fi; the subset NFKC would fix without
       NFKC's collateral damage);
    2. dehyphenate line-broken words — ``compu-\\n tation`` rejoins when
       BOTH fragments are lowercase letters (the standard extraction
       heuristic; ``well-\\n known`` compounds stay hyphenated only if a
       dictionary says so, which this deliberately does not claim);
    3. collapse runs of whitespace to single spaces and trim.

    Emits (id, clean_text, n_ligatures, n_rejoins) — the counts make the
    gate sensitive to each stage separately.  Pure JVM regex/translate,
    zero python, zero shuffle."""
    t = F.col(text_col)
    n_lig = F.lit(0).cast("long")
    for lig in _LIGATURES:
        n_lig = n_lig + F.size(
            F.split(t, lig, -1)
        ).cast("long") - 1
    expanded = t
    for lig, rep in _LIGATURES.items():
        expanded = F.regexp_replace(expanded, lig, rep)
    n_rejoin = (
        F.size(
            F.regexp_extract_all(
                expanded, F.lit("([a-z])-\\s*\\n\\s*([a-z])"), F.lit(0)
            )
        )
        .cast("long")
    )
    rejoined = F.regexp_replace(expanded, "([a-z])-\\s*\\n\\s*([a-z])", "$1$2")
    collapsed = F.trim(F.regexp_replace(rejoined, "\\s+", " "))
    return df.select(
        F.col(id_col).alias("id"),
        collapsed.alias("clean_text"),
        n_lig.alias("n_ligatures"),
        n_rejoin.alias("n_rejoins"),
    )
