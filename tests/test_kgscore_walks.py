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


def _py_transe_eval(triples: list[tuple[str, str, str]], per_triple: int = 8):
    """Python mirror of kgscore.transe_eval (filtered protocol, deterministic
    tie-break) for the cross-check."""
    base = sorted(set(triples))
    ents = sorted({s for s, _, _ in base})
    true = set(base)
    per_pred: dict[str, list[int]] = {}
    for s, p, o in base:
        negs = []
        for i in range(1, per_triple + 1):
            idx = int(
                hashlib.md5(f"{s}|{p}|{o}|{i}".encode()).hexdigest()[:8], 16
            ) % len(ents)
            ne = ents[idx]
            if ne != o and (s, p, ne) not in true:
                negs.append(ne)
        e_pos = _energy(s, p, o)
        stronger = sum(
            1
            for ne in negs
            if _energy(s, p, ne) < e_pos or (_energy(s, p, ne) == e_pos and ne < o)
        )
        per_pred.setdefault(p, []).append(1 + stronger)
    return {
        p: (
            len(ranks),
            sum(1_000_000 // r for r in ranks),
            sum(1 for r in ranks if r <= 1),
            sum(1 for r in ranks if r <= 3),
        )
        for p, ranks in per_pred.items()
    }


def test_transe_eval_matches_python_reference(spark):
    from aiwhispr_spark.operators.kgscore import transe_eval

    triples = [
        (f"E{i % 7}", ["founded", "acquired"][i % 2], f"E{(i * 3 + 1) % 7}")
        for i in range(20)
    ]
    df = spark.createDataFrame(triples, "subj string, pred string, obj string")
    got = {
        r["pred"]: (r["n_triples"], r["mrr_sum_i"], r["hits1_n"], r["hits3_n"])
        for r in transe_eval(df, per_triple=8).collect()
    }
    assert got == _py_transe_eval(triples, per_triple=8)


def test_transe_eval_counts_triples_with_all_negatives_filtered(spark):
    """A single-entity KG: every corruption is a no-op or an accidental
    positive, so zero negatives survive — the positive must still count
    with rank 1 (left-join path), not vanish."""
    from aiwhispr_spark.operators.kgscore import transe_eval

    df = spark.createDataFrame(
        [("A", "p", "A")], "subj string, pred string, obj string"
    )
    [row] = transe_eval(df, per_triple=4).collect()
    assert (row["pred"], row["n_triples"], row["mrr_sum_i"], row["hits1_n"]) == (
        "p",
        1,
        1_000_000,
        1,
    )
