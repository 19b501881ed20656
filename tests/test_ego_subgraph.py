"""Ego-network extraction (operators/graph_query.py::ego_subgraph): induced
semantics (both endpoints in range), min-hop labels, multi-seed union,
undirectedness.  The hash-value gate lives in __spark_entry__
(kg_ego_subgraph: ring + chord + disconnected component)."""

from __future__ import annotations

from aiwhispr_spark.operators.graph_query import ego_subgraph


def _ego(spark, pairs, seeds, radius):
    df = spark.createDataFrame(pairs, "src string, dst string")
    return {
        (r.a, r.b): (r.a_hops, r.b_hops)
        for r in ego_subgraph(df, seeds=seeds, radius=radius).collect()
    }


def test_induced_semantics_and_min_hops(spark):
    # path a-b-c-d-e, seed a, radius 2: nodes a,b,c; edge (c,d) has d out of
    # range -> excluded even though c is in range
    pairs = [("a", "b"), ("b", "c"), ("c", "d"), ("d", "e")]
    got = _ego(spark, pairs, seeds=["a"], radius=2)
    assert got == {("a", "b"): (0, 1), ("b", "c"): (1, 2)}


def test_multi_seed_takes_nearest_and_edges_are_undirected(spark):
    # direction reversed in input; distance to the NEAREST seed wins
    pairs = [("b", "a"), ("c", "b"), ("d", "c")]
    got = _ego(spark, pairs, seeds=["a", "d"], radius=1)
    # (b, c) is induced too: BOTH endpoints sit at hop 1 of their nearest seed
    assert got == {
        ("a", "b"): (0, 1),
        ("b", "c"): (1, 1),
        ("c", "d"): (1, 0),
    }


def test_duplicate_seeds_do_not_multiply_edges(spark):
    pairs = [("a", "b")]
    df = spark.createDataFrame(pairs, "src string, dst string")
    rows = ego_subgraph(df, seeds=["a", "a"], radius=1).collect()
    assert len(rows) == 1
