"""Skew-defusing helpers: salted repartition and two-stage aggregation.

The north rule calls out head-entity skew: Zipfian subjects ("Entity_1",
country names) concentrate shuffle partitions.  The reference's analogue is
its round-robin work split (aiwhisprBaseClasses.py:324-387) which balances by
*count* but knows nothing about keys.  Here:

* ``salted_repartition`` — distribute by ``(hash(key), salt)`` so one hot key
  spreads over `salt_factor` partitions; correct whenever downstream work is
  per-row (writes, scoring) rather than per-key.
* ``salted_count`` — two-stage aggregation: partial count per (key, salt)
  (map-side combine shrinks the hot key to `salt_factor` rows), then the tiny
  second-stage merge.  AQE's skew-join splitting handles join-side skew; this
  handles groupBy-side skew that AQE cannot re-split.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_SALT = 16


def with_salt(df: DataFrame, salt_factor: int = DEFAULT_SALT, salt_col: str = "_salt") -> DataFrame:
    """Deterministic per-row salt (no rand(): reproducibility across retries —
    a nondeterministic salt breaks task-retry idempotence at scale)."""
    return df.withColumn(
        salt_col,
        F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(salt_factor)).cast("int"),
    )


def salted_repartition(
    df: DataFrame, key: str | Column, num_partitions: int, salt_factor: int = DEFAULT_SALT
) -> DataFrame:
    """Repartition on (key, salt) — hot keys fan out over salt_factor partitions."""
    k = F.col(key) if isinstance(key, str) else key
    salted = with_salt(df, salt_factor)
    out = salted.repartition(num_partitions, k, F.col("_salt"))
    return out.drop("_salt")


def salted_count(
    df: DataFrame, key: str, salt_factor: int = DEFAULT_SALT, count_col: str = "cnt"
) -> DataFrame:
    """groupBy(key).count() resistant to hot keys: partial per (key, salt),
    then merge.  (Spark's hash aggregate already does map-side partials; the
    explicit salt additionally splits the *reduce* side of a hot key.)"""
    salted = with_salt(df, salt_factor)
    partial = salted.groupBy(key, "_salt").agg(F.count(F.lit(1)).alias("_partial"))
    return partial.groupBy(key).agg(F.sum("_partial").cast("long").alias(count_col))


def top_heavy_keys(df: DataFrame, key: str, threshold_rows: int) -> DataFrame:
    """First-pass skew sketch (SURVEY.md §7.4): keys whose row count exceeds
    `threshold_rows`, used to pick a salt factor before the big shuffle."""
    return salted_count(df, key).filter(F.col("cnt") >= threshold_rows)
