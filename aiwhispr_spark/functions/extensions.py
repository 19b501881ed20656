"""UDAF / UDTF registration surface.

SURVEY §2.8 notes the reference has no user-defined aggregate or
table-function registration (U1-U5 are hardwired scalar functions).  This
module is the engine's idiomatic-Spark extension surface:

* ``gmean_udaf`` — a grouped-aggregate Arrow ``pandas_udf`` (Spark's UDAF
  form): geometric mean, the classic "not expressible as a built-in single
  pass" aggregate.  One Arrow batch per group partition; combines with
  partial aggregation like any agg expression.
* ``SplitSentencesUDTF`` — a Python UDTF (1 row → N rows) wrapping the SAME
  sentence segmenter the T5 kernel uses (kernels.split_sentences), usable
  from SQL via ``LATERAL split_sentences_udtf(col)``.
* ``register_extensions(spark)`` — the registration entry point (the
  dynamic-dispatch analogue of the reference's initialize* module loaders,
  U4): makes both available to ``spark.sql`` by name.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql.functions import pandas_udf, udtf


@pandas_udf("double")
def gmean_udaf(v: pd.Series) -> float:
    """Geometric mean of a positive numeric column (grouped-agg pandas UDF)."""
    import numpy as np

    x = v.astype("float64")
    x = x[x > 0]
    if len(x) == 0:
        return float("nan")
    return float(np.exp(np.log(x).mean()))


@udtf(returnType="sent_no int, sentence string")
class SplitSentencesUDTF:
    """1 text → N (sent_no, sentence) rows using the engine's deterministic
    sentence segmenter (kernels.split_sentences — the same split T5 uses, so
    UDTF output composes with the language filter row-for-row)."""

    def eval(self, text: str):
        from aiwhispr_spark import kernels

        for i, s in enumerate(kernels.split_sentences(text or "")):
            yield i, s


def register_extensions(spark) -> None:
    """Register the extension functions into the session catalog (SQL-visible
    names: ``gmean``, ``split_sentences_udtf``)."""
    spark.udf.register("gmean", gmean_udaf)
    spark.udtf.register("split_sentences_udtf", SplitSentencesUDTF)
