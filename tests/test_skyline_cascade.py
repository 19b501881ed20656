"""Skyline + LT-cascade gates:

* skyline — dominance semantics on a handcrafted frontier (strict dominance
  removes, all-criteria ties both survive, single-criterion champions
  survive);
* cascade — threshold arithmetic (exactly-at-threshold activates, one
  weight-unit below does not), monotone rounds, parallel-edge pre-sum,
  unreached nodes absent, seeds at round 0.
"""

from __future__ import annotations

from aiwhispr_spark.operators.graph_query import lt_cascade_bounded
from aiwhispr_spark.operators.ranking import skyline_pareto


def test_skyline_dominance_and_ties(spark):
    rows = [
        (1, 10, 10),  # dominated by 2
        (2, 20, 20),  # frontier
        (3, 30, 5),   # frontier (len champion)
        (4, 5, 30),   # frontier (fresh champion)
        (5, 20, 20),  # exact tie with 2: BOTH survive
        (6, 20, 19),  # dominated by 2 (geq all + gt one)
    ]
    df = spark.createDataFrame(rows, "id long, x long, y long")
    got = {r["id"] for r in skyline_pareto(df, ["x", "y"], id_col="id").collect()}
    assert got == {2, 3, 4, 5}


def test_lt_cascade_threshold_boundary_and_monotonicity(spark):
    # b: total in-weight 4 (2 from seed a, 2 from c); theta 1/2 -> needs 2
    #    -> activates round 1 from a alone (exactly at threshold)
    # c: total 10, only 4 reachable from {a,b} -> 4*2 < 10 -> never
    # d: total 3, 2 from b -> 2*2 >= 3 -> activates the round AFTER b
    edges = [
        ("a", "b", 2), ("c", "b", 2),
        ("a", "c", 2), ("b", "c", 2), ("x", "c", 6),
        ("b", "d", 2), ("y", "d", 1),
    ]
    df = spark.createDataFrame(edges, "src string, dst string, w long")
    got = {
        r["node"]: r["activated_round"]
        for r in lt_cascade_bounded(df, ["a"], rounds=3).collect()
    }
    assert got == {"a": 0, "b": 1, "d": 2}
    # one weight-unit below threshold: bump b's total in-weight to 5
    df2 = spark.createDataFrame(
        edges + [("z", "b", 1)], "src string, dst string, w long"
    )
    got2 = {
        r["node"]: r["activated_round"]
        for r in lt_cascade_bounded(df2, ["a"], rounds=3).collect()
    }
    assert "b" not in got2  # 2*2 < 5


def test_lt_cascade_parallel_edges_presum(spark):
    # two (a,b) edges of weight 1 must count as weight 2, not max/first
    df = spark.createDataFrame(
        [("a", "b", 1), ("a", "b", 1), ("c", "b", 2)],
        "src string, dst string, w long",
    )
    got = {
        r["node"]: r["activated_round"]
        for r in lt_cascade_bounded(df, ["a"], rounds=2).collect()
    }
    assert got.get("b") == 1  # 2*2 >= 4
