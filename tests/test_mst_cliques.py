"""Borůvka MSF semantics (graph.py::boruvka_mst) and 4-clique enumeration
(graph_query.py::cliques_k4): hand-computed spanning trees, forest behavior
on disconnected input, once-per-clique canonical ordering."""

from __future__ import annotations


def test_boruvka_hand_computed_mst(spark):
    from aiwhispr_spark.operators.graph import boruvka_mst

    # classic 5-node example; unique-MST by distinct weights
    edges = spark.createDataFrame(
        [(1, 2, 5), (2, 3, 4), (1, 3, 10), (3, 4, 2), (2, 4, 8), (4, 5, 1), (1, 5, 20)],
        "a long, b long, w long",
    )
    got = {(r.a, r.b, r.w) for r in boruvka_mst(edges).collect()}
    assert got == {(1, 2, 5), (2, 3, 4), (3, 4, 2), (4, 5, 1)}


def test_boruvka_forest_on_disconnected_components(spark):
    from aiwhispr_spark.operators.graph import boruvka_mst

    edges = spark.createDataFrame(
        [(1, 2, 3), (2, 3, 7), (1, 3, 9),  # comp A: triangle → drops (1,3)
         (10, 11, 1)],                      # comp B: single edge
        "a long, b long, w long",
    )
    got = {(r.a, r.b) for r in boruvka_mst(edges).collect()}
    assert got == {(1, 2), (2, 3), (10, 11)}


def test_boruvka_erases_direction_and_multiplicity(spark):
    from aiwhispr_spark.operators.graph import boruvka_mst

    # duplicate + reversed edges collapse to min weight before the run
    edges = spark.createDataFrame(
        [(2, 1, 5), (1, 2, 3), (2, 3, 4), (3, 3, 1)],
        "a long, b long, w long",
    )
    got = {(r.a, r.b, r.w) for r in boruvka_mst(edges).collect()}
    assert got == {(1, 2, 3), (2, 3, 4)}  # self-loop dropped, min parallel kept


def test_cliques_k4_exactly_once_and_near_miss_excluded(spark):
    from aiwhispr_spark.operators.graph_query import cliques_k4

    # K4 on {1,2,3,4} (given as a mix of directions/dups) + a near-miss
    # {1,2,3,5} missing edge (3,5)
    k4 = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4)]
    near = [(1, 5), (2, 5)]
    edges = spark.createDataFrame(
        [(b, a) for a, b in k4] + k4 + near, "src long, dst long"
    )
    rows = cliques_k4(edges).collect()
    assert [(r.a, r.b, r.c, r.d) for r in rows] == [(1, 2, 3, 4)]


def test_cliques_k5_contains_five_k4s(spark):
    from aiwhispr_spark.operators.graph_query import cliques_k4
    from itertools import combinations

    edges = spark.createDataFrame(
        list(combinations(range(5), 2)), "src long, dst long"
    )
    rows = {(r.a, r.b, r.c, r.d) for r in cliques_k4(edges).collect()}
    assert rows == set(combinations(range(5), 4))
