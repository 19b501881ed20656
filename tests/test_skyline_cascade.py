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
    got = {r["id"] for r in skyline_pareto(df, ["x", "y"]).collect()}
    assert got == {2, 3, 4, 5}
    # duplicate ids must not interact: the weak (id=7) row drops, the
    # frontier (id=7) row survives — an id-keyed drop would kill both
    dup = spark.createDataFrame(
        [(7, 100, 100), (7, 1, 1), (8, 50, 50)], "id long, x long, y long"
    )
    rows = skyline_pareto(dup, ["x", "y"]).collect()
    assert [(r["id"], r["x"]) for r in rows] == [(7, 100)]


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


def test_ring_movement_bound_and_wrap(spark):
    """Removing one of 4 shards must move ONLY keys from its arcs (≈1/4),
    never between surviving shards; keys below the first ring position wrap."""
    from aiwhispr_spark.operators.sharding import consistent_hash_assign

    rows = [(f"k{i}",) for i in range(400)]
    df = spark.createDataFrame(rows, "url string")
    full = consistent_hash_assign(df, ["s1", "s2", "s3", "s4"], "url", out_col="a")
    both = consistent_hash_assign(full, ["s1", "s2", "s4"], "url", out_col="b").collect()
    moved = [r for r in both if r["a"] != r["b"]]
    # every moved key was on s3; survivors never shuffle among themselves
    assert all(r["a"] == "s3" for r in moved)
    assert all(r["b"] != "s3" for r in both)
    # movement is s3's share, not (n-1)/n: strictly under half on 400 keys
    assert 0 < len(moved) < 200
    # NULL keys stay visible with NULL shard
    nulldf = spark.createDataFrame([(None,)], "url string")
    assert consistent_hash_assign(nulldf, ["s1", "s2"], "url").collect()[0]["shard"] is None


def test_knapsack_boundary_prorata_and_sentinel(spark):
    from aiwhispr_spark.operators.mixing import fractional_knapsack

    rows = [
        ("a", 100, 10),  # ratio 10: funded fully
        ("b", 50, 10),   # ratio 5: funded fully
        ("c", 30, 10),   # ratio 3: boundary -> 5 of 10 funded
        ("d", 10, 10),   # ratio 1: nothing left
        ("e", 99, 0),    # unpriced: sentinel, no allocation
    ]
    df = spark.createDataFrame(rows, "host string, v long, c long")
    got = {r["key"]: r for r in fractional_knapsack(df, "host", "v", "c", budget=25).collect()}
    assert got["a"]["alloc_cost"] == 10 and got["a"]["captured_mi"] == 100 * 1_000_000
    assert got["b"]["alloc_cost"] == 10
    assert got["c"]["alloc_cost"] == 5 and got["c"]["captured_mi"] == 15 * 1_000_000
    assert got["d"]["alloc_cost"] == 0 and got["d"]["captured_mi"] == 0
    assert got["e"]["ratio_i"] == -1 and got["e"]["alloc_cost"] == 0
    assert sum(r["alloc_cost"] for r in got.values()) == 25


def test_politeness_schedule_matches_sequential_simulation(spark):
    import itertools

    from aiwhispr_spark.operators.robots import politeness_schedule

    rows = [
        ("h", "u1", 100), ("h", "u2", 100), ("h", "u3", 101),
        ("h", "u4", 200),  # idle gap: fetch at its own arrival
        ("g", "u5", 100),
    ]
    df = spark.createDataFrame(rows, "host string, url string, arrival_ep long")
    got = {r["url"]: r for r in politeness_schedule(df, delay_s=7).collect()}
    # sequential reference: t_i = max(a_i, t_{i-1} + d) in (arrival, url) order
    for host, group in itertools.groupby(
        sorted(rows, key=lambda r: (r[0], r[2], r[1])), key=lambda r: r[0]
    ):
        t = None
        for _, url, a in group:
            t = a if t is None else max(a, t + 7)
            assert got[url]["fetch_ep"] == t, url
    assert got["u4"]["wait_s"] == 0  # idle gap resets the queue
    assert got["u2"]["wait_s"] == 7 and got["u3"]["wait_s"] == 13
    assert got["u5"]["wait_s"] == 0  # hosts are independent


def test_elias_fano_bits_hand_computed(spark):
    from aiwhispr_spark.operators.fulltext import elias_fano_postings_stats

    # token 'x' in docs {1, 5, 9}: n=3, u=10, u//n=3 -> l=1,
    # ef = 3*1 + 3 + (9>>1) + 1 = 11 bits
    rows = [(1, "x"), (5, "x"), (9, "x"), (2, "y")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["token"]: r for r in elias_fano_postings_stats(df).collect()}
    assert (got["x"]["low_bits"], got["x"]["ef_bits"]) == (1, 11)
    # singleton posting at id 2: u=3, u//n=3 -> l=1, ef = 1+1+(2>>1)+1 = 4
    assert (got["y"]["low_bits"], got["y"]["ef_bits"]) == (1, 4)


def test_sequential_pattern_subsequence_semantics(spark):
    import datetime as dt

    from aiwhispr_spark.operators.temporal import sequential_pattern_support

    t0 = dt.datetime(2024, 1, 1)
    sec = lambda n: t0 + dt.timedelta(seconds=n)  # noqa: E731
    rows = [
        # u1: a(0) .. x(5) .. b(10): a->b holds through the gap
        ("u1", "a", sec(0)), ("u1", "x", sec(5)), ("u1", "b", sec(10)),
        # u2: b before a only -> supports b->a, not a->b
        ("u2", "b", sec(0)), ("u2", "a", sec(1)),
        # u3: simultaneous a,b -> STRICT order, supports neither direction
        ("u3", "a", sec(0)), ("u3", "b", sec(0)),
    ]
    df = spark.createDataFrame(rows, "user_id string, event_type string, ts timestamp")
    got = {
        (r["antecedent"], r["consequent"]): r["n_users"]
        for r in sequential_pattern_support(df, min_support=1).collect()
    }
    assert got[("a", "b")] == 1  # u1 only (u3 tie excluded)
    assert got[("b", "a")] == 1  # u2 only
    assert got[("a", "x")] == 1 and got[("x", "b")] == 1
    # support_mi denominator is ALL users (3), not just matching ones
    out = {
        (r["antecedent"], r["consequent"]): r["support_mi"]
        for r in sequential_pattern_support(df, min_support=1).collect()
    }
    assert out[("a", "b")] == 1_000_000 // 3


def test_jsd_closed_forms(spark):
    import math

    from aiwhispr_spark.operators.textstats import vocabulary_drift_jsd

    a = spark.createDataFrame([("x y",)], "text string")
    b_same = spark.createDataFrame([("x y",)], "text string")
    r = vocabulary_drift_jsd(a, b_same).collect()[0]
    assert r["jsd_mi"] == 0 and r["n_shared_types"] == 2  # identical -> 0
    # disjoint vocabularies -> exactly ln 2 (per-term ln(2) rounds once)
    b_disj = spark.createDataFrame([("p q",)], "text string")
    r2 = vocabulary_drift_jsd(a, b_disj).collect()[0]
    assert r2["jsd_mi"] == round(1_000_000 * math.log(2)) - 1 or \
           r2["jsd_mi"] == round(1_000_000 * math.log(2))  # two floor-divs
    assert (r2["n_only_a"], r2["n_only_b"], r2["n_shared_types"]) == (2, 2, 0)
