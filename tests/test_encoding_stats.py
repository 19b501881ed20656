"""Column encoding-size planner semantics (layout.py::
column_encoding_stats): exact run/byte arithmetic, row-group scoping,
best-choice ordering."""

from __future__ import annotations


def test_encoding_stats_hand_computed(spark):
    from aiwhispr_spark.operators.layout import column_encoding_stats

    # 8 rows, sorted by sk: c = a a a a b b a a  → 3 runs
    rows = [(i, "a" if i in (0, 1, 2, 3, 6, 7) else "b") for i in range(8)]
    df = spark.createDataFrame(rows, "sk long, c string")
    r = column_encoding_stats(df, ["c"], "sk").collect()[0]
    assert (r.n_rows, r.n_distinct, r.n_runs) == (8, 2, 3)
    assert r.plain_b == 8 * (4 + 1)
    # dict: payload 2*(4+1) + (8 rows * 1 bit + 7)//8 = 10 + 1
    assert r.dict_b == 11
    assert r.rle_b == 3 * (8 + 1)
    assert r.best == "dict"


def test_encoding_stats_runs_reset_at_rowgroup_boundary(spark):
    from aiwhispr_spark.operators.layout import column_encoding_stats

    # constant column, 10 rows, rowgroup=5 → 2 runs (one per group)
    df = spark.createDataFrame([(i, "x") for i in range(10)], "sk long, c string")
    r = column_encoding_stats(df, ["c"], "sk", rowgroup=5).collect()[0]
    assert r.n_runs == 2
    r1 = column_encoding_stats(df, ["c"], "sk", rowgroup=100).collect()[0]
    # 1 distinct: dict payload is tiny, dict wins even over one run
    assert r1.n_runs == 1 and r1.best == "dict"


def test_encoding_stats_rle_wins_on_long_runs(spark):
    from aiwhispr_spark.operators.layout import column_encoding_stats

    # 2 runs of 100 rows each: rle = 2·(8+1) = 18 beats
    # dict = 2·(4+1) + (200·1+7)//8 = 35
    df = spark.createDataFrame(
        [(i, "a" if i < 100 else "b") for i in range(200)],
        "sk long, c string",
    )
    r = column_encoding_stats(df, ["c"], "sk", rowgroup=1000).collect()[0]
    assert (r.n_runs, r.rle_b, r.dict_b) == (2, 18, 35)
    assert r.best == "rle"


def test_encoding_stats_nulls_are_empty_values(spark):
    from aiwhispr_spark.operators.layout import column_encoding_stats

    df = spark.createDataFrame(
        [(0, None), (1, None), (2, "q")], "sk long, c string"
    )
    r = column_encoding_stats(df, ["c"], "sk").collect()[0]
    assert r.n_distinct == 2 and r.n_runs == 2
    assert r.plain_b == 4 + 4 + 5
