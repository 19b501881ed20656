"""ACL residual-push PPR gates: exact integer mass conservation (the floor
remainders must stay in the residual — any leak breaks cross-engine hash
parity), locality (only the seed's reachable neighborhood ever holds mass),
threshold semantics (sub-threshold residuals freeze), and the dangling-node
caveat (out-degree-0 nodes hold their residual forever)."""

from __future__ import annotations

from aiwhispr_spark.operators.graph_query import ppr_push_bounded

SCALE = 100_000_000


def _run(spark, edges, seed, rounds=4, eps_i=100_000):
    df = spark.createDataFrame(edges, "src string, dst string")
    return {
        r["node"]: (r["p_i"], r["r_i"])
        for r in ppr_push_bounded(df, seed, rounds=rounds, eps_i=eps_i).collect()
    }


def test_mass_conserved_exactly(spark):
    edges = [("a", "b"), ("a", "c"), ("b", "c"), ("c", "a"), ("c", "d")]
    got = _run(spark, edges, "a")
    assert sum(p + r for p, r in got.values()) == SCALE
    # estimate concentrates at the seed, locality holds
    assert got["a"][0] > max(v[0] for k, v in got.items() if k != "a")


def test_dangling_node_holds_residual(spark):
    # d has no out-edges: whatever lands there can only sit in r, never p
    edges = [("a", "d"), ("a", "b"), ("b", "d")]
    got = _run(spark, edges, "a", rounds=6)
    assert got["d"][0] == 0 and got["d"][1] > 0


def test_subthreshold_residual_freezes(spark):
    # eps_i above the seed mass: nothing is ever active, state = initial
    edges = [("a", "b")]
    got = _run(spark, edges, "a", rounds=3, eps_i=SCALE + 1)
    assert got == {"a": (0, SCALE)}


def test_unreachable_nodes_never_appear(spark):
    edges = [("a", "b"), ("x", "y")]
    got = _run(spark, edges, "a", rounds=4)
    assert "x" not in got and "y" not in got
