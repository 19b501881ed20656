"""Greedy set-cover gates: marginal-gain semantics (round 2 counts only NEW
items — the winner can differ from the 2nd-biggest raw source), exhaustion
emits nothing (rounds stop when covered), deterministic tie-break."""

from __future__ import annotations

from aiwhispr_spark.operators.mixing import greedy_source_cover


def _run(spark, rows, k):
    df = spark.createDataFrame(rows, "src string, item string")
    return [
        (r["round"], r["source"], r["gain"], r["covered_total"])
        for r in greedy_source_cover(df, "src", "item", k=k)
        .orderBy("round")
        .collect()
    ]


def test_marginal_gain_beats_raw_size(spark):
    # a = {1,2,3,4}; b = {1,2,3}; c = {5,6}
    # raw sizes: a(4) > b(3) > c(2), but after a, b adds NOTHING and c adds 2
    rows = [("a", str(i)) for i in (1, 2, 3, 4)]
    rows += [("b", str(i)) for i in (1, 2, 3)]
    rows += [("c", str(i)) for i in (5, 6)]
    got = _run(spark, rows, k=3)
    assert got[0] == (1, "a", 4, 4)
    assert got[1] == (2, "c", 2, 6)
    # round 3: b's items are all covered, so b is GONE from the uncovered
    # incidence — zero-gain sources never win a round (cover is complete)
    assert len(got) == 2


def test_exhaustion_emits_no_rows(spark):
    rows = [("a", "1"), ("a", "2")]
    got = _run(spark, rows, k=3)
    # after round 1 the incidence is empty: rounds 2-3 vanish
    assert got == [(1, "a", 2, 2)]


def test_tie_breaks_by_source_asc(spark):
    rows = [("b", "1"), ("b", "2"), ("a", "3"), ("a", "4")]
    got = _run(spark, rows, k=2)
    assert got[0][1] == "a" and got[1][1] == "b"


def test_densest_subgraph_finds_planted_core(spark):
    """Peeling must flag the planted clique's snapshot, not round 1; the
    threshold is strict (a node at exactly (1+eps)·avg peels)."""
    from aiwhispr_spark.operators.graph_query import densest_subgraph_peel

    # 4-clique (deg 3 each) + 6 leaves on node a (deg-1 periphery)
    edges = [("a", "b"), ("a", "c"), ("a", "d"), ("b", "c"), ("b", "d"), ("c", "d")]
    edges += [(f"x{i}", "a") for i in range(6)]
    df = spark.createDataFrame(edges, "src string, dst string")
    got = {r["round"]: r for r in densest_subgraph_peel(df, rounds=3).collect()}
    # r1: V=10, E=12, density 1.2; leaves (deg 1 <= 1.1*2.4) peel
    assert (got[1]["n_nodes"], got[1]["n_edges"], got[1]["is_best"]) == (10, 12, 0)
    # r2: the clique alone, density 1.5 -> best
    assert (got[2]["n_nodes"], got[2]["n_edges"], got[2]["is_best"]) == (4, 6, 1)
    # r3: clique is 3-regular = avg -> strict threshold peels it; fixpoint 0s
    assert (got[3]["n_nodes"], got[3]["density_mi"], got[3]["is_best"]) == (0, 0, 0)


def test_densest_duplicate_and_directed_edges_collapse(spark):
    from aiwhispr_spark.operators.graph_query import densest_subgraph_peel

    df = spark.createDataFrame(
        [("a", "b"), ("b", "a"), ("a", "b"), ("a", "a")], "src string, dst string"
    )
    got = {r["round"]: r for r in densest_subgraph_peel(df, rounds=1).collect()}
    assert (got[1]["n_nodes"], got[1]["n_edges"]) == (2, 1)
