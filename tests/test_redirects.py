"""Redirect-chain resolution (operators/redirects.py): pointer-halving
correctness on chains/cycles/bounds.  The hash-value gate lives in
__spark_entry__ (redirect_resolution vs a closed-form DuckDB oracle)."""

from __future__ import annotations

import pytest

from aiwhispr_spark.operators.redirects import resolve_redirects


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src string, dst string")


def test_chains_resolve_with_exact_hops(spark):
    e = _edges(
        spark,
        [("a3", "a2"), ("a2", "a1"), ("a1", "a0"), ("b1", "b0")],
    )
    got = {(r.src, r.final, r.hops_i, r.cyc_i) for r in resolve_redirects(e).collect()}
    assert got == {
        ("a3", "a0", 3, 0),
        ("a2", "a0", 2, 0),
        ("a1", "a0", 1, 0),
        ("b1", "b0", 1, 0),
    }


def test_cycles_flagged_and_keep_source(spark):
    e = _edges(
        spark,
        [("x", "y"), ("y", "x"), ("p", "q"), ("q", "r"), ("r", "p"), ("t1", "t0")],
    )
    got = {(r.src, r.final, r.hops_i, r.cyc_i) for r in resolve_redirects(e).collect()}
    assert got == {
        ("x", "x", -1, 1),
        ("y", "y", -1, 1),
        ("p", "p", -1, 1),
        ("q", "q", -1, 1),
        ("r", "r", -1, 1),
        ("t1", "t0", 1, 0),
    }


def test_chain_into_cycle_is_flagged(spark):
    # tail node whose chain ENTERS a cycle never reaches a terminal
    e = _edges(spark, [("tail", "x"), ("x", "y"), ("y", "x")])
    got = {(r.src, r.cyc_i) for r in resolve_redirects(e).collect()}
    assert got == {("tail", 1), ("x", 1), ("y", 1)}


def test_long_chain_within_log2_rounds(spark):
    n = 50  # 6 rounds cover 64 hops
    e = _edges(spark, [(f"n{i}", f"n{i-1}") for i in range(1, n + 1)])
    rows = {r.src: (r.final, r.hops_i) for r in resolve_redirects(e).collect()}
    assert rows[f"n{n}"] == ("n0", n)
    assert rows["n1"] == ("n0", 1)


def test_over_bound_chain_degrades_to_flagged_not_wrong(spark):
    e = _edges(spark, [(f"n{i}", f"n{i-1}") for i in range(1, 9)])
    rows = {r.src: (r.final, r.hops_i, r.cyc_i) for r in resolve_redirects(e, max_chain=4).collect()}
    assert rows["n1"] == ("n0", 1, 0)
    assert rows["n4"] == ("n0", 4, 0)
    # n8's chain is 8 > max_chain: flagged unresolved, source kept
    assert rows["n8"] == ("n8", -1, 1)


def test_non_functional_map_raises(spark):
    with pytest.raises(ValueError, match="not functional"):
        resolve_redirects(_edges(spark, [("a", "b"), ("a", "c")]))


def test_self_loops_dropped(spark):
    got = resolve_redirects(_edges(spark, [("a", "a"), ("b", "c")])).collect()
    assert {(r.src, r.final) for r in got} == {("b", "c")}
