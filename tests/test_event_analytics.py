"""Hand-computed semantics for the event-analytics trio
(operators/temporal.py::funnel_conversion / retention_cohorts /
conversion_attribution): greedy earliest-completion funnel chaining,
weekly cohort offsets, and last/first-touch credit with the '(none)'
reconciliation bucket."""

from __future__ import annotations

import datetime as dt


def _ts(s: str) -> dt.datetime:
    return dt.datetime.fromisoformat(s)


def _events(spark, rows):
    return spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, event_type string"
    )


def test_funnel_greedy_uses_later_retry_not_first_occurrence(spark):
    """A step-k event BEFORE step k-1 completion must not satisfy the funnel,
    but a LATER retry of step k must — the min-ts-per-step shortcut would
    drop user 2 at 'click'."""
    from aiwhispr_spark.operators.temporal import funnel_conversion

    rows = [
        # user 1: clean in-order funnel
        (1, 1, _ts("2024-01-01 10:00:00"), "signup"),
        (2, 1, _ts("2024-01-01 11:00:00"), "view"),
        (3, 1, _ts("2024-01-01 12:00:00"), "click"),
        # user 2: click BEFORE view, then a retry click after — still converts
        (4, 2, _ts("2024-01-01 10:00:00"), "signup"),
        (5, 2, _ts("2024-01-01 10:30:00"), "click"),
        (6, 2, _ts("2024-01-01 11:00:00"), "view"),
        (7, 2, _ts("2024-01-01 11:30:00"), "click"),
        # user 3: signup only
        (8, 3, _ts("2024-01-01 10:00:00"), "signup"),
        # user 4: view/click but never signed up — not in funnel at all
        (9, 4, _ts("2024-01-01 10:00:00"), "view"),
        (10, 4, _ts("2024-01-01 11:00:00"), "click"),
    ]
    out = funnel_conversion(_events(spark, rows), ["signup", "view", "click"])
    by_step = {r.step: r for r in out.collect()}
    assert by_step["signup"].users == 3
    assert by_step["view"].users == 2
    assert by_step["click"].users == 2  # user 2's retry counts
    assert by_step["view"].conv_from_prev_mi == 2 * 1000000 // 3
    assert by_step["click"].conv_from_prev_mi == 1000000
    assert by_step["click"].conv_from_first_mi == 2 * 1000000 // 3
    assert by_step["signup"].step_idx == 0 and by_step["click"].step_idx == 2


def test_funnel_strict_after_same_timestamp_does_not_advance(spark):
    from aiwhispr_spark.operators.temporal import funnel_conversion

    rows = [
        (1, 1, _ts("2024-01-01 10:00:00"), "signup"),
        (2, 1, _ts("2024-01-01 10:00:00"), "view"),  # same instant: NOT after
    ]
    out = funnel_conversion(_events(spark, rows), ["signup", "view"])
    by_step = {r.step: r.users for r in out.collect()}
    assert by_step == {"signup": 1, "view": 0}


def test_retention_offsets_and_ratio(spark):
    from aiwhispr_spark.operators.temporal import retention_cohorts

    rows = [
        # users 1+2 cohort = week of Mon 2024-01-01; user 1 returns week 2
        (1, 1, _ts("2024-01-02 10:00:00"), "view"),
        (2, 1, _ts("2024-01-09 10:00:00"), "view"),  # offset 1
        (3, 2, _ts("2024-01-03 10:00:00"), "view"),
        # user 3 cohort = following week
        (4, 3, _ts("2024-01-10 10:00:00"), "view"),
    ]
    out = retention_cohorts(_events(spark, rows), max_offset=4)
    got = {(r.cohort_week, r.week_offset): (r.active_users, r.retained_mi) for r in out.collect()}
    assert got[("2024-01-01", 0)] == (2, 1000000)
    assert got[("2024-01-01", 1)] == (1, 500000)
    assert got[("2024-01-08", 0)] == (1, 1000000)
    assert len(got) == 3


def test_attribution_last_first_touch_window_and_none_bucket(spark):
    from aiwhispr_spark.operators.temporal import conversion_attribution

    rows = [
        # user 1: view → click → purchase; last=click, first=view
        (1, 1, _ts("2024-01-10 10:00:00"), "view"),
        (2, 1, _ts("2024-01-10 11:00:00"), "click"),
        (3, 1, _ts("2024-01-10 12:00:00"), "purchase"),
        # user 2: only touch is OUTSIDE the 7-day window → (none)
        (4, 2, _ts("2024-01-01 10:00:00"), "view"),
        (5, 2, _ts("2024-01-09 10:00:01"), "purchase"),
        # user 3: same-ts touches — event_id breaks the tie (higher id wins last)
        (6, 3, _ts("2024-01-10 10:00:00"), "view"),
        (7, 3, _ts("2024-01-10 10:00:00"), "click"),
        (8, 3, _ts("2024-01-10 11:00:00"), "purchase"),
    ]
    out = conversion_attribution(_events(spark, rows), window_days=7)
    got = {(r.last_touch, r.first_touch): r.conversions for r in out.collect()}
    assert got[("click", "view")] == 2  # users 1 and 3
    assert got[("(none)", "(none)")] == 1
    assert sum(got.values()) == 3  # totals reconcile with conversion count
