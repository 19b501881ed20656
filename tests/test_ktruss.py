"""k-truss decomposition (operators/graph_query.py::k_truss): cascade
peeling (bowtie), clique survival, star elimination (the k-core contrast),
k=2 degeneracy.  The hash-value gate lives in __spark_entry__ (kg_ktruss)."""

from __future__ import annotations

import itertools

import pytest

from aiwhispr_spark.operators.graph_query import k_truss


def _truss(spark, pairs, k):
    df = spark.createDataFrame(pairs, "src string, dst string")
    return {(r.a, r.b): r.support for r in k_truss(df, k=k).collect()}


def test_bowtie_cascade_peels_fully_but_clique_survives(spark):
    clique = [(f"c{a}", f"c{b}") for a, b in itertools.combinations(range(5), 2)]
    bowtie = [("t0", "t1"), ("t0", "t2"), ("t1", "t2"), ("t1", "t3"), ("t2", "t3")]
    got = _truss(spark, clique + bowtie, k=4)
    assert set(got) == {(f"c{a}", f"c{b}") for a, b in itertools.combinations(range(5), 2)}
    assert set(got.values()) == {3}


def test_star_is_not_a_truss_unlike_kcore(spark):
    # a 5-spoke star is a 2-core-ish hub but has zero triangles: a 3-truss
    # (support >= 1) eliminates it entirely
    star = [("hub", f"s{j}") for j in range(5)]
    assert _truss(spark, star, k=3) == {}


def test_k2_keeps_every_edge(spark):
    # k=2 requires support >= 0: nothing peels
    got = _truss(spark, [("a", "b"), ("b", "c")], k=2)
    assert got == {("a", "b"): 0, ("b", "c"): 0}
