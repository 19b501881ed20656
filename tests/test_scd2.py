"""SCD2 versioned-store merge (temporal.py::scd2_apply) — every arm pinned:
no-op, chaining, in-batch dup collapse, stale rejection, new key, untouched
key, immutable closed history."""

from pyspark.sql import functions as F


def _store(spark, rows):
    return spark.createDataFrame(
        rows, "subj string, pred string, obj string, valid_from long, valid_to long"
    )


def _batch(spark, rows):
    return spark.createDataFrame(rows, "subj string, pred string, obj string, ts long")


def _apply(spark, store_rows, batch_rows):
    from aiwhispr_spark.operators.temporal import scd2_apply

    out = scd2_apply(_store(spark, store_rows), _batch(spark, batch_rows))
    return sorted(
        out.collect(), key=lambda r: (r.subj, r.pred, r.valid_from)
    )


def test_chain_and_close(spark):
    got = _apply(
        spark,
        [("E1", "color", "red", 100, None)],
        [("E1", "color", "blue", 200), ("E1", "color", "green", 300)],
    )
    assert [(r.obj, r.valid_from, r.valid_to) for r in got] == [
        ("red", 100, 200),
        ("blue", 200, 300),
        ("green", 300, None),
    ]


def test_noop_and_inbatch_dup_collapse(spark):
    got = _apply(
        spark,
        [("E1", "color", "red", 100, None)],
        [
            ("E1", "color", "red", 200),  # no-op vs open value
            ("E1", "color", "blue", 300),
            ("E1", "color", "blue", 400),  # consecutive in-batch dup
            ("E1", "color", "red", 500),  # back to red IS a change
        ],
    )
    assert [(r.obj, r.valid_from, r.valid_to) for r in got] == [
        ("red", 100, 300),
        ("blue", 300, 500),
        ("red", 500, None),
    ]


def test_stale_rejected_new_key_untouched_closed_immutable(spark):
    got = _apply(
        spark,
        [
            ("E1", "color", "old", 0, 100),  # closed history
            ("E1", "color", "red", 100, None),
            ("E2", "color", "grey", 50, None),  # untouched
        ],
        [
            ("E1", "color", "stale", 90),  # ts <= valid_from -> rejected
            ("E3", "color", "new", 10),  # unseen key opens a version
        ],
    )
    assert [(r.subj, r.obj, r.valid_from, r.valid_to) for r in got] == [
        ("E1", "old", 0, 100),
        ("E1", "red", 100, None),
        ("E2", "grey", 50, None),
        ("E3", "new", 10, None),
    ]


def test_windows_run_on_batch_not_store(spark):
    # plan shape: every Window consumes the DELTA side (the store only ever
    # joins).  3 = lag + lead, with the lag subtree duplicated by its two
    # consumers (new_versions and first_change) — O(2·delta), never O(store)
    from aiwhispr_spark.operators.temporal import scd2_apply

    store = _store(spark, [("E1", "color", "red", 100, None)])
    batch = _batch(spark, [("E1", "color", "blue", 200)])
    plan = scd2_apply(store, batch)._jdf.queryExecution().optimizedPlan().toString()
    assert plan.count("Window") == 3
    # each window is keyed (no global single-partition window anywhere)
    assert plan.count("windowspecdefinition(subj") == 3


def test_same_ts_changes_tie_break_by_value_deterministically(spark):
    # the documented (ts, val) tie order: green sorts after blue, so blue is
    # a zero-length version and green holds the open slot — SAME result on
    # every run regardless of partitioning (pre-aggregate upstream when the
    # tie order is not the semantics you want)
    got = _apply(
        spark,
        [("E1", "color", "red", 100, None)],
        [("E1", "color", "green", 200), ("E1", "color", "blue", 200)],
    )
    assert [(r.obj, r.valid_from, r.valid_to) for r in got] == [
        ("red", 100, 200),
        ("blue", 200, 200),
        ("green", 200, None),
    ]
