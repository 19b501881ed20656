"""Bounded SCC (operators/graph_query.py::strongly_connected_components):
min-node component ids, singleton reporting, the bound contract (an SCC whose
diameter exceeds max_hops fragments — documented), cycle-node dedup.  The
hash-value gate lives in __spark_entry__ (kg_scc_bounded)."""

from __future__ import annotations

from aiwhispr_spark.operators.graph_query import strongly_connected_components


def _scc(spark, pairs, max_hops):
    df = spark.createDataFrame(pairs, "src string, dst string")
    return {
        r.node: (r.scc_id, r.scc_size)
        for r in strongly_connected_components(df, max_hops=max_hops).collect()
    }


def test_ring_two_cycle_and_singletons(spark):
    got = _scc(
        spark,
        [("r0", "r1"), ("r1", "r2"), ("r2", "r0"),
         ("a", "b"), ("b", "a"),
         ("x", "r0"), ("c0", "c1")],
        max_hops=3,
    )
    assert got == {
        "r0": ("r0", 3), "r1": ("r0", 3), "r2": ("r0", 3),
        "a": ("a", 2), "b": ("a", 2),
        "x": ("x", 1), "c0": ("c0", 1), "c1": ("c1", 1),
    }


def test_bound_contract_fragments_oversized_components(spark):
    # 4-ring needs 3 hops to mutually reach the far node; at max_hops=2 the
    # opposite corners never see each other and the ring fragments into
    # adjacent-mutual groups — documented behavior, pinned here
    got = _scc(
        spark,
        [("r0", "r1"), ("r1", "r2"), ("r2", "r3"), ("r3", "r0")],
        max_hops=2,
    )
    assert all(size < 4 for _, size in got.values())
    got_full = _scc(
        spark,
        [("r0", "r1"), ("r1", "r2"), ("r2", "r3"), ("r3", "r0")],
        max_hops=3,
    )
    assert got_full == {f"r{j}": ("r0", 4) for j in range(4)}
