"""Preference-pair mining from versioned page snapshots.

A crawl corpus that re-fetches pages over time (the SCD2 / snapshot-diff
inputs, operators/temporal.py) implicitly records EDITS: the same url whose
text improved between two consecutive fetches is a (rejected -> chosen)
preference pair — exactly the shape reward-model / DPO training consumes.
This operator turns the versioned store into that dataset: for every url,
consecutive-snapshot pairs (by timestamp) where an integer quality signal
rose by at least ``min_gain`` emit one row with both texts and the gain.

The quality signal is an input COLUMN, not something this operator invents
— callers plug in whatever integer signal they trust (token counts,
gopher-style filter scores from operators/textstats.py, a hashed classifier
margin).  Keeping it an integer keeps the gate exact across engines.

Consecutive-only pairing (lag 1) is deliberate: v1->v3 pairs double-count
the v2 edit and teach the model nothing the chain didn't already contain;
the number of emitted pairs is bounded by the number of edits, not its
square.

100 TB shape: ONE url-keyed window (lag over ts) — the exchange keys on
url, never a global sort; everything after is a row-local comparison.
Like asof_join/scd2_apply, input must be unique per (url, ts) —
pre-aggregate upstream or the lag is nondeterministic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def preference_pairs(
    snapshots: DataFrame,
    min_gain: int = 1,
    key_col: str = "url",
    ts_col: str = "warc_ts",
    text_col: str = "text",
    quality_col: str = "q",
) -> DataFrame:
    """(url, ts_old, ts_new, rejected, chosen, gain) — see module
    contract.  ``gain = q_new - q_old >= min_gain`` gates emission; equal
    or degraded revisions emit nothing (a reward model must never be told
    an unchanged page is an improvement)."""
    base = snapshots.select(
        F.col(key_col).alias("url"),
        F.col(ts_col).cast("long").alias("ts_new"),
        F.col(text_col).alias("chosen"),
        F.col(quality_col).cast("long").alias("_q"),
    )
    w = Window.partitionBy("url").orderBy(F.col("ts_new").asc())
    lagged = base.select(
        "url",
        F.lag("ts_new").over(w).alias("ts_old"),
        "ts_new",
        F.lag("chosen").over(w).alias("rejected"),
        "chosen",
        (F.col("_q") - F.lag("_q").over(w)).alias("gain"),
    )
    return (
        lagged.filter(F.col("gain") >= int(min_gain))
        .select(
            "url",
            F.col("ts_old").cast("long").alias("ts_old"),
            "ts_new",
            "rejected",
            "chosen",
            F.col("gain").cast("long").alias("gain"),
        )
    )
