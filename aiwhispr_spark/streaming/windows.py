"""Watermarked windowed aggregation over event streams.

New component (SURVEY §2.8-adjacent: the reference has no windowed stream
analytics).  Late data is handled the Structured-Streaming way: a watermark
bounds how late an event may arrive; windows finalize (and state is purged)
once the watermark passes their end — the knob that keeps streaming-agg
state O(open windows), not O(stream history), at 100 TB/day event volumes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def windowed_event_counts(
    events: DataFrame,
    ts_col: str = "ts",
    group_col: str | None = "event_type",
    window: str = "10 minutes",
    slide: str | None = None,
    watermark: str = "30 minutes",
) -> DataFrame:
    """Tumbling (or sliding, if ``slide``) per-window event counts with a
    late-data watermark.  Append output mode emits each window exactly once,
    finalized, after the watermark passes its end; events later than the
    watermark are dropped (the documented, bounded-state trade)."""
    win = (
        F.window(F.col(ts_col), window, slide)
        if slide
        else F.window(F.col(ts_col), window)
    )
    keys = [win.alias("win")] + ([F.col(group_col)] if group_col else [])
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(*keys)
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            *([group_col] if group_col else []),
            "n",
        )
    )
