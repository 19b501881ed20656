"""Unit tests for HITS (graph.py::hits) and k-core peeling (graph.py::kcore)."""

import pytest

from aiwhispr_spark.operators.graph import hits, kcore


def _hits_py(edges, iterations):
    """Pure-python reference of the L1-normalized synchronous HITS."""
    edges = sorted(set(edges))
    nodes = sorted({a for a, _ in edges} | {b for _, b in edges})
    n = len(nodes)
    hub = {v: 1.0 / n for v in nodes}
    auth = {v: 1.0 / n for v in nodes}
    for _ in range(iterations):
        auth = {v: sum(hub[u] for u, w in edges if w == v) for v in nodes}
        t = sum(auth.values())
        auth = {v: a / t for v, a in auth.items()}
        hub = {u: sum(auth[w] for v, w in edges if v == u) for u in nodes}
        t = sum(hub.values())
        hub = {u: h / t for u, h in hub.items()}
    return hub, auth


@pytest.fixture(scope="module")
def star_edges():
    # directory page 0 links to authorities 1..4; page 5 links to 1 only;
    # authority 1 links back to 0 (so it has both roles)
    return [(0, 1), (0, 2), (0, 3), (0, 4), (5, 1), (1, 0)]


def test_hits_matches_python_reference(spark, star_edges):
    df = spark.createDataFrame(star_edges, "src long, dst long")
    got = {
        r["node"]: (r["hub"], r["auth"]) for r in hits(df, iterations=3).collect()
    }
    hub, auth = _hits_py(star_edges, 3)
    assert set(got) == set(hub)
    for v in hub:
        assert got[v][0] == pytest.approx(hub[v], abs=1e-12)
        assert got[v][1] == pytest.approx(auth[v], abs=1e-12)


def test_hits_hub_vs_authority_separation(spark, star_edges):
    df = spark.createDataFrame(star_edges, "src long, dst long")
    s = {r["node"]: r for r in hits(df, iterations=5).collect()}
    # 0 is the dominant hub; 1 the dominant authority
    assert s[0]["hub"] == max(r["hub"] for r in s.values())
    assert s[1]["auth"] == max(r["auth"] for r in s.values())
    # L1 normalization: both columns sum to 1
    assert sum(r["hub"] for r in s.values()) == pytest.approx(1.0)
    assert sum(r["auth"] for r in s.values()) == pytest.approx(1.0)


def test_hits_duplicate_edges_collapse(spark):
    df = spark.createDataFrame(
        [(0, 1), (0, 1), (0, 2)], "src long, dst long"
    )
    s = {r["node"]: r for r in hits(df, iterations=2).collect()}
    # the duplicate 0→1 edge must not double 1's authority over 2's
    assert s[1]["auth"] == pytest.approx(s[2]["auth"])


def test_kcore_clique_and_cycle_survive(spark):
    import __spark_entry__ as entry

    df = spark.createDataFrame(entry._kcore_fixture_edges(), "src long, dst long")
    got = {r["node"]: r["degree"] for r in kcore(df, k=2).collect()}
    assert got == {0: 5, 1: 5, 2: 5, 3: 5, 4: 5, 5: 5, 20: 2, 21: 2, 22: 2, 23: 2}


def test_kcore_k3_drops_cycle(spark):
    import __spark_entry__ as entry

    df = spark.createDataFrame(entry._kcore_fixture_edges(), "src long, dst long")
    got = {r["node"] for r in kcore(df, k=3).collect()}
    assert got == {0, 1, 2, 3, 4, 5}  # only the K6 clique is 3-core


def test_kcore_empty_result(spark):
    # a bare path has no 2-core
    df = spark.createDataFrame([(0, 1), (1, 2)], "src long, dst long")
    assert kcore(df, k=2).count() == 0


def test_kcore_whole_graph_is_core(spark):
    # triangle: fixed point on round one (zero doomed)
    df = spark.createDataFrame([(0, 1), (1, 2), (2, 0)], "src long, dst long")
    got = {r["node"]: r["degree"] for r in kcore(df, k=2).collect()}
    assert got == {0: 2, 1: 2, 2: 2}
