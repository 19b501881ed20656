"""Seeded label propagation (operators/graph_query.py::
propagate_labels_from_seeds): clamped seeds, layered adoption (first
assignment freezes), tie-break, unreached NULLs.  The hash-value gate lives
in __spark_entry__ (kg_seeded_label_propagation)."""

from __future__ import annotations

from aiwhispr_spark.operators.graph_query import propagate_labels_from_seeds


def _lp(spark, pairs, seeds, rounds):
    e = spark.createDataFrame(pairs, "src string, dst string")
    s = spark.createDataFrame(seeds, "node string, label string")
    return {
        r.node: (r.label, r.is_seed_i)
        for r in propagate_labels_from_seeds(e, s, rounds=rounds).collect()
    }


def test_chain_spread_tie_break_and_unreached(spark):
    pairs = [("a", "m1"), ("m1", "m2"), ("m2", "m3"), ("m3", "b"), ("u1", "u2")]
    got = _lp(spark, pairs, [("a", "org"), ("b", "person")], rounds=3)
    assert got["m1"] == ("org", 0)
    assert got["m3"] == ("person", 0)
    # middle ties org-vs-person in round 2: min label wins
    assert got["m2"] == ("org", 0)
    assert got["u1"] == (None, 0) and got["u2"] == (None, 0)
    assert got["a"] == ("org", 1)


def test_seed_never_flips_even_when_outvoted(spark):
    # seed 's' surrounded by three nodes that will all be 'x': s stays 'y'
    pairs = [("s", "n1"), ("s", "n2"), ("s", "n3"),
             ("x0", "n1"), ("x0", "n2"), ("x0", "n3")]
    got = _lp(spark, pairs, [("s", "y"), ("x0", "x")], rounds=3)
    assert got["s"] == ("y", 1)
    # each n sees one x-seed and one y-seed: tie -> min label 'x'
    assert got["n1"] == ("x", 0)


def test_edge_less_seed_stays_visible(spark):
    got = _lp(spark, [("a", "b")], [("z", "org")], rounds=1)
    assert got["z"] == ("org", 1)
    assert got["a"] == (None, 0)
