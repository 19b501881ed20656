"""Bounded SimRank (graph.py::simrank_bounded) — hand-computed rounds on the
classic shared-in-neighbor shapes; integer floor per round is the contract."""


def _run(spark, edges, rounds):
    from aiwhispr_spark.operators.graph import simrank_bounded

    e = spark.createDataFrame(edges, "src string, dst string")
    out = simrank_bounded(e, rounds=rounds)
    return {(r.a, r.b): r.s for r in out.collect()}


def test_shared_single_in_neighbor_converges(spark):
    # u -> a, u -> b: s(a,b) = 0.8 * s(u,u) = 800000, stable thereafter
    for rounds in (1, 3):
        s = _run(spark, [("u", "a"), ("u", "b")], rounds)
        assert s[("a", "b")] == 800000 and s[("b", "a")] == 800000
        assert s[("a", "a")] == 1000000


def test_indegree_normalization_and_floor(spark):
    # u -> a; u,v -> b: s1(a,b) = 8*(s(u,u) + s(u,v)) // (10*1*2) = 400000;
    # u,v have no in-edges so s(u,v) stays 0 and round 2 repeats exactly
    s1 = _run(spark, [("u", "a"), ("u", "b"), ("v", "b")], 1)
    s2 = _run(spark, [("u", "a"), ("u", "b"), ("v", "b")], 2)
    assert s1[("a", "b")] == 400000
    assert s2[("a", "b")] == 400000
    assert ("u", "v") not in s1  # 0-scores are dropped, not materialized


def test_no_shared_ancestry_yields_no_pair(spark):
    # disjoint chains: nothing off the diagonal ever becomes nonzero
    s = _run(spark, [("u", "a"), ("v", "b")], 3)
    assert all(a == b for (a, b) in s)
