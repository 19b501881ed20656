"""asof_join unit semantics (operators/temporal.py): latest right row with
right_ts <= left_ts per key, inclusive at equality, NULL when none precedes."""

from __future__ import annotations

import datetime as dt


def _ts(s: str) -> dt.datetime:
    return dt.datetime.fromisoformat(s)


def test_asof_join_semantics(spark):
    from aiwhispr_spark.operators.temporal import asof_join

    left = spark.createDataFrame(
        [
            (1, 10, _ts("2024-01-01 10:00:00")),  # between r1 and r2
            (2, 10, _ts("2024-01-01 12:00:00")),  # exactly at r2 → inclusive
            (3, 10, _ts("2024-01-01 08:00:00")),  # before any right row → NULL
            (4, 20, _ts("2024-01-01 10:00:00")),  # key with no right rows → NULL
            (5, 30, _ts("2024-01-02 00:00:00")),  # far after the only right row
        ],
        "event_id int, user_id int, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            (10, _ts("2024-01-01 09:00:00"), 100),
            (10, _ts("2024-01-01 12:00:00"), 200),
            (30, _ts("2024-01-01 00:00:00"), 300),
        ],
        "user_id int, ts timestamp, snap int",
    )
    out = {
        r["event_id"]: r["snap"]
        for r in asof_join(left, right, on="user_id", value_cols=["snap"]).collect()
    }
    assert out == {1: 100, 2: 200, 3: None, 4: None, 5: 300}


def test_bucketed_range_join_boundaries(spark):
    """Exact window semantics (l.ts < r.ts <= l.ts + W) incl. the bucket seam:
    a qualifying pair whose rows land in adjacent buckets must still meet."""
    from aiwhispr_spark.operators.temporal import bucketed_range_join

    left = spark.createDataFrame(
        [
            (1, 10, _ts("2024-01-01 10:30:00")),
            (2, 10, _ts("2024-01-01 13:59:30")),  # candidates in the next bucket
            (3, 20, _ts("2024-01-01 10:30:00")),  # other key: no clicks
        ],
        "event_id int, user_id int, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            (10, _ts("2024-01-01 10:30:00"), 100),  # == l.ts → excluded (strict >)
            (10, _ts("2024-01-01 11:30:00"), 101),  # == l.ts + 1h → included
            (10, _ts("2024-01-01 11:30:01"), 102),  # just past window → excluded
            (10, _ts("2024-01-01 14:00:30"), 103),  # next bucket for event 2 → included
            (20, _ts("2024-01-01 12:00:00"), 104),  # wrong window for key 20
        ],
        "user_id int, ts timestamp, click_id int",
    )
    pairs = {
        (r["event_id"], r["click_id_r"])
        for r in bucketed_range_join(left, right, on="user_id").collect()
    }
    assert pairs == {(1, 101), (2, 103)}


def test_bucketed_range_join_is_equi_join(spark):
    """Plan check: the bucket trick must compile to a hash/merge equi-join —
    never the nested-loop/cartesian fallback a raw inequality join produces."""
    from aiwhispr_spark.operators.temporal import bucketed_range_join

    left = spark.range(200).selectExpr(
        "id AS event_id", "CAST(id % 9 AS INT) AS user_id", "timestamp_seconds(id * 50) AS ts"
    )
    right = spark.range(300).selectExpr(
        "CAST(id % 9 AS INT) AS user_id", "timestamp_seconds(id * 37) AS ts", "id AS click_id"
    )
    df = bucketed_range_join(left, right, on="user_id")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan and "CartesianProduct" not in plan, plan[:1500]
    assert any(j in plan for j in ("SortMergeJoin", "BroadcastHashJoin", "ShuffledHashJoin")), plan[:1500]


def test_asof_join_is_single_shuffle(spark):
    """Plan check: the union+window formulation must not contain a join at all
    (no broadcast-nested-loop / cartesian fallback an inequality join risks)."""
    from aiwhispr_spark.operators.temporal import asof_join

    left = spark.range(100).selectExpr(
        "id AS event_id", "CAST(id % 7 AS INT) AS user_id", "timestamp_seconds(id * 60) AS ts"
    )
    right = spark.range(20).selectExpr(
        "CAST(id % 7 AS INT) AS user_id", "timestamp_seconds(id * 300) AS ts", "id AS snap"
    )
    plan = asof_join(left, right, on="user_id", value_cols=["snap"])._jdf.queryExecution().executedPlan().toString()
    for bad in ("BroadcastNestedLoopJoin", "CartesianProduct", "SortMergeJoin", "BroadcastHashJoin"):
        assert bad not in plan, f"asof_join plan fell back to {bad}:\n{plan[:1500]}"
    assert plan.count("Exchange hashpartitioning") == 1, plan[:1500]


def test_event_transitions_hand_computed_with_tie(spark):
    from aiwhispr_spark.operators.temporal import event_transitions

    rows = [
        # user 1: view -> click -> view ; same-ts tie broken by event_id
        (1, 1, 100, "view"),
        (2, 1, 200, "click"),
        (3, 1, 200, "view"),  # ties with event 2 at ts=200; id orders it after
        # user 2: view -> view (no cross-user transition to user 1)
        (4, 2, 100, "view"),
        (5, 2, 150, "view"),
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, user_id long, ts long, event_type string"
    )
    got = {(r.src_type, r.dst_type): (r.n, r.p_mi) for r in event_transitions(ev).collect()}
    # transitions: u1: view->click, click->view; u2: view->view
    assert got[("view", "click")] == (1, 500000)  # of 2 view-outgoing
    assert got[("view", "view")] == (1, 500000)
    assert got[("click", "view")] == (1, 1000000)
    assert len(got) == 3  # nothing crosses user boundaries
