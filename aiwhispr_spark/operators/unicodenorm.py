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
from pyspark.sql import DataFrame
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
