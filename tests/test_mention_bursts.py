"""Burst detection (operators/temporal.py::mention_bursts): hand-built
timelines pinning the cross-multiplied ratio test, gap-day semantics of the
RANGE frame, novelty arm, and min_count floor.  The hash-value gate lives in
__spark_entry__ (mention_bursts vs the DuckDB RANGE-window twin)."""

from __future__ import annotations

from aiwhispr_spark.operators.temporal import mention_bursts


def _flags(spark, rows, **kw):
    df = spark.createDataFrame(rows, "entity string, day bigint")
    return {
        (r.entity, r.day): (r.n_mentions, r.trailing_sum, r.is_burst_i)
        for r in mention_bursts(df, **kw).collect()
    }


def test_ratio_test_is_cross_multiplied_daily_average(spark):
    # steady 2/day for days 0-6, then 7 on day 7: trailing_sum=14 over a
    # 7-day window (avg 2) -> 7 >= 3x avg  => burst;  3 on day 8 is not
    # (trailing now 19: 3*7000=21000 < 3000*19=57000)
    rows = [("A", d) for d in range(7) for _ in range(2)]
    rows += [("A", 7)] * 7 + [("A", 8)] * 3
    got = _flags(spark, rows, window_days=7, factor_pm=3000, min_count=3)
    assert got[("A", 7)] == (7, 14, 1)
    assert got[("A", 8)] == (3, 19, 0)


def test_gap_days_count_as_zero_history(spark):
    # mentions on day 0 fall OUT of day 10's 7-day trailing window
    rows = [("A", 0)] * 5 + [("A", 10)] * 3
    got = _flags(spark, rows, window_days=7, factor_pm=3000, min_count=3)
    assert got[("A", 10)] == (3, 0, 1)  # novelty arm: no recent history


def test_min_count_floor_blocks_tiny_spikes(spark):
    rows = [("A", 3)] * 2  # brand new but below min_count
    got = _flags(spark, rows, window_days=7, factor_pm=3000, min_count=3)
    assert got[("A", 3)] == (2, 0, 0)
