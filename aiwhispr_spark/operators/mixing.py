"""Temperature-weighted source re-sampling for training-data mixing: flatten
a skewed source distribution by sampling source *s* at rate

    rate_s = min(1, base_frac · (n_max / n_s)^(1-alpha))

(UniMax/multilingual-temperature style: alpha=1 keeps natural proportions,
alpha→0 approaches uniform-over-sources; n_max is the largest source so the
head source is sampled at exactly ``base_frac`` and smaller sources are
boosted toward parity, capped at keeping everything).

The reference has no corpus-composition tooling; every pre-training pipeline
needs this between curation and packing, so it's first-class here.

Determinism discipline: the keep decision is ``md5(doc_id) % 1e6 <
rate_i`` with ``rate_i = round(1e6·rate_s)`` — the only float is ONE
per-source scalar (a pow of two exact integers, no cross-source float sum
anywhere), rounded to a scaled int before any comparison, so Spark and the
DuckDB oracle agree bit-for-bit and re-runs are reproducible (a rerun keeps
the SAME documents — sampling is content-addressed, not rng-state-addressed).

100 TB shape: one map-side-combinable count per source (tiny result), rates
BROADCAST back, keep-filter is a narrow projection.  One shuffle total, no
python.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from aiwhispr_spark.operators.textstats import fingerprint_expr

_BUCKETS = 1_000_000


def _bucket(id_col: Column) -> Column:
    # the repo's one md5→60-bit fingerprint discipline, folded to [0, 1e6)
    return fingerprint_expr(id_col.cast("string")) % _BUCKETS


def source_rates(
    docs: DataFrame,
    source_col: str = "source",
    alpha: float = 0.5,
    base_frac: float = 0.5,
) -> DataFrame:
    """(source, n_s, rate_i) — scaled-int sampling rate per source."""
    counts = docs.groupBy(source_col).agg(F.count(F.lit(1)).alias("n_s"))
    n_max = counts.agg(F.max("n_s").alias("n_max"))
    rate = (
        F.pow(F.col("n_max").cast("double") / F.col("n_s"), F.lit(1.0 - alpha))
        * F.lit(base_frac)
        * F.lit(float(_BUCKETS))
    )
    return counts.crossJoin(F.broadcast(n_max)).select(
        source_col,
        F.col("n_s").cast("long").alias("n_s"),
        F.least(F.lit(float(_BUCKETS)), F.round(rate)).cast("bigint").alias("rate_i"),
    )


def temperature_sample(
    docs: DataFrame,
    source_col: str = "source",
    id_col: str = "doc_id",
    alpha: float = 0.5,
    base_frac: float = 0.5,
) -> DataFrame:
    """The sampled corpus: input rows whose id-bucket falls under their
    source's rate, with ``rate_i`` attached for audit."""
    rates = source_rates(docs, source_col, alpha, base_frac)
    return docs.join(
        F.broadcast(rates.select(source_col, "rate_i")), source_col
    ).filter(_bucket(F.col(id_col)) < F.col("rate_i"))
