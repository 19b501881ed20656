"""node2vec biased walks (operators/graph.py::node2vec_walks): python-mirror
reproduction of the md5-indexed weight-expanded pick, dangling termination,
reproducibility.  The hash-value gate lives in __spark_entry__
(node2vec_walks vs the unrolled DuckDB twin)."""

from __future__ import annotations

import hashlib

from aiwhispr_spark.operators.graph import node2vec_walks


def _md5i(key: str) -> int:
    return int(hashlib.md5(key.encode()).hexdigest()[:8], 16)


def _mirror(edges, length, rw=1, bw=2, iw=4):
    nbrs = {}
    for a, b in set(edges):
        nbrs.setdefault(a, set()).add(b)
    nbrs = {k: sorted(v) for k, v in nbrs.items()}
    nodes = sorted({n for e in edges for n in e})
    rows = set()
    for start in nodes:
        rows.add((start, 0, start))
        if start not in nbrs:
            continue
        cur = nbrs[start][_md5i(f"{start}:1") % len(nbrs[start])]
        prev = start
        rows.add((start, 1, cur))
        for t in range(2, length + 1):
            if cur not in nbrs:
                break
            exp = []
            for x in nbrs[cur]:
                w = rw if x == prev else (bw if x in nbrs.get(prev, []) else iw)
                exp += [x] * w
            nxt = exp[_md5i(f"{prev}|{cur}:{t}") % len(exp)]
            prev, cur = cur, nxt
            rows.add((start, t, cur))
    return rows


def test_walks_match_python_mirror_including_bias_arms(spark):
    edges = [(f"n{k}", f"n{(k + 1) % 8}") for k in range(8)] + [
        (f"n{k}", f"n{(k + 2) % 8}") for k in range(8)
    ]
    df = spark.createDataFrame(edges, "src string, dst string")
    got = {(r.start, r.step, r.node) for r in node2vec_walks(df, length=3).collect()}
    assert got == _mirror(edges, 3)


def test_dangling_node_terminates_walk(spark):
    edges = [("a", "b")]  # b has no out-edges
    df = spark.createDataFrame(edges, "src string, dst string")
    got = {(r.start, r.step, r.node) for r in node2vec_walks(df, length=3).collect()}
    assert got == {("a", 0, "a"), ("a", 1, "b"), ("b", 0, "b")}
