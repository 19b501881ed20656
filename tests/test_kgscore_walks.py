"""Unit tests for TransE scoring (operators/kgscore.py) and deterministic
random walks (graph.deterministic_walks)."""

import hashlib

import pytest

from aiwhispr_spark.operators.graph import deterministic_walks
from aiwhispr_spark.operators.kgscore import transe_scores


def _comp(name: str, i: int) -> int:
    return int(hashlib.md5(f"{name}:{i}".encode()).hexdigest()[:8], 16) % 2001 - 1000


def _energy(s: str, p: str, o: str, dim: int = 16) -> int:
    return sum(
        abs(_comp(s, i) + _comp(f"rel:{p}", i) - _comp(o, i)) for i in range(dim)
    )


def test_transe_matches_python_reference(spark):
    df = spark.createDataFrame(
        [("A", "founded", "B"), ("C", "based_in", "D")],
        "subj string, pred string, obj string",
    )
    got = {
        (r["subj"], r["pred"], r["obj"]): r["energy_i"]
        for r in transe_scores(df).collect()
    }
    assert got[("A", "founded", "B")] == _energy("A", "founded", "B")
    assert got[("C", "based_in", "D")] == _energy("C", "based_in", "D")


def test_transe_relation_namespace(spark):
    # a predicate named like an entity must not share its vector: the energy
    # of (A, X, A) would be 0 if 'X' the relation aliased 'X' the entity
    df = spark.createDataFrame([("X", "X", "X")], "subj string, pred string, obj string")
    e = transe_scores(df).first()["energy_i"]
    assert e == _energy("X", "X", "X")
    assert e > 0  # s and o cancel; rel:X remains


def test_transe_identity_bias(spark):
    # with s == o the energy reduces to Σ|r_i| — the same for every pair
    df = spark.createDataFrame(
        [("A", "p", "A"), ("B", "p", "B")], "subj string, pred string, obj string"
    )
    es = [r["energy_i"] for r in transe_scores(df).collect()]
    assert es[0] == es[1]


def _walks_py(edges, length):
    edges = sorted(set(edges))
    nbrs = {}
    for a, b in edges:
        nbrs.setdefault(a, []).append(b)
    nbrs = {k: sorted(v) for k, v in nbrs.items()}
    nodes = sorted({a for a, _ in edges} | {b for _, b in edges})
    out = set()
    for start in nodes:
        cur = start
        out.add((start, 0, cur))
        for t in range(1, length + 1):
            if cur not in nbrs:
                break
            ns = nbrs[cur]
            idx = int(hashlib.md5(f"{cur}:{t}".encode()).hexdigest()[:8], 16) % len(ns)
            cur = ns[idx]
            out.add((start, t, cur))
    return out


def test_walks_match_python_reference(spark):
    edges = [("a", "b"), ("a", "c"), ("b", "c"), ("c", "a"), ("c", "d")]
    df = spark.createDataFrame(edges, "src string, dst string")
    got = {
        (r["start"], r["step"], r["node"])
        for r in deterministic_walks(df, length=3).collect()
    }
    assert got == _walks_py(edges, 3)


def test_walks_terminate_at_dangling(spark):
    df = spark.createDataFrame([("a", "b")], "src string, dst string")
    got = sorted(
        (r["start"], r["step"], r["node"])
        for r in deterministic_walks(df, length=4).collect()
    )
    # walk from a: a → b, stops (b dangling); walk from b: just b
    assert got == [("a", 0, "a"), ("a", 1, "b"), ("b", 0, "b")]


def test_walks_deterministic_across_runs(spark):
    edges = [(str(i), str((i * 3 + 1) % 7)) for i in range(7)]
    df = spark.createDataFrame(edges, "src string, dst string")
    r1 = sorted(map(tuple, deterministic_walks(df, length=4).collect()))
    r2 = sorted(map(tuple, deterministic_walks(df, length=4).collect()))
    assert r1 == r2
