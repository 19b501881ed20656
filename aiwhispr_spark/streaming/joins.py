"""Stream-stream joins and watermark-bounded dedup.

New components (SURVEY §2.8-adjacent; the reference has no stream joins):
the two remaining Structured Streaming primitives a crawl/event pipeline
needs beyond sessionization and windowed counts —

* **interval join**: match two live streams on a key within a bounded
  event-time interval (fetch-scheduled ⋈ fetch-completed, impression ⋈
  click).  The interval condition + watermarks are what BOUND the join
  state: either side's buffered rows are evicted once the other side's
  watermark passes the interval, so state is O(in-flight window), not
  O(stream history) — the only formulation that survives 100 TB/day.
* **dropDuplicatesWithinWatermark**: exactly-once-per-key emission where
  the dedup memory is bounded by the watermark (re-emits a key once the
  watermark has evicted it — the documented trade vs the unbounded
  applyInPandasWithState first-seen dedup in stateful.py, which never
  forgets but whose state grows with distinct keys).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stream_interval_join(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
    left_ts: str,
    right_ts: str,
    max_delay_seconds: int,
    watermark: str = "30 seconds",
) -> DataFrame:
    """Inner event-time interval join: a right row matches a left row with
    the same key when ``left_ts <= right_ts <= left_ts + max_delay``.

    Both sides MUST carry watermarks (Spark refuses unbounded stream-stream
    joins in append mode otherwise) — together with the interval condition
    they let the engine evict buffered rows deterministically.  The two
    schemas must be fully DISJOINT (not just the key columns) so every
    column reference in the condition and the output is unambiguous.
    """
    overlap = sorted(set(left.columns) & set(right.columns))
    if overlap:
        raise ValueError(f"left/right schemas share columns {overlap} — rename one side")
    lw = left.withWatermark(left_ts, watermark)
    rw = right.withWatermark(right_ts, watermark)
    cond = (
        (F.col(left_key) == F.col(right_key))
        & (F.col(right_ts) >= F.col(left_ts))
        & (
            F.col(right_ts)
            <= F.col(left_ts) + F.expr(f"INTERVAL {int(max_delay_seconds)} SECONDS")
        )
    )
    return lw.join(rw, cond, "inner")


def dedup_within_watermark(
    stream: DataFrame,
    keys: list[str],
    ts_col: str,
    watermark: str = "10 seconds",
) -> DataFrame:
    """First occurrence per key within the watermark horizon; a key recurs
    in the output only after the watermark evicted its state (bounded-memory
    dedup — the streaming twin of dedup_exact for feeds where duplicates
    cluster in time, e.g. re-fetches and mirror pushes within a crawl)."""
    return stream.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(keys)
