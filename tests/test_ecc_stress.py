"""Unit gates for graph_query.py::eccentricity_profile and
::stress_centrality — hand-computed σ multiplicities on a diamond-plus-tail
graph, sink/source exclusion, hop-bound truncation.  The sf0.01 value gates
(host graph vs the unrolled DuckDB DP) live in __spark_entry__.py."""

from aiwhispr_spark.operators.graph_query import (
    eccentricity_profile,
    stress_centrality,
)

# diamond a→{b,c}→d plus tail d→e: σ(a,d)=2, σ(a,e)=2
DIAMOND = [("a", "b"), ("a", "c"), ("b", "d"), ("c", "d"), ("d", "e")]


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src string, dst string")


def test_stress_counts_path_multiplicity(spark):
    out = {
        r["node"]: r["stress"]
        for r in stress_centrality(_edges(spark, DIAMOND), max_hops=6).collect()
    }
    # b: through-paths (a,d) and (a,e) → 2; d: (a,e) carries σ=2 plus
    # (b,e) and (c,e) → 4; sources/sinks broker nothing
    assert out == {"b": 2, "c": 2, "d": 4}


def test_stress_hop_bound_drops_long_pairs(spark):
    out = {
        r["node"]: r["stress"]
        for r in stress_centrality(_edges(spark, DIAMOND), max_hops=2).collect()
    }
    # d(a,e)=3 exceeds the bound: its contributions vanish everywhere
    assert out == {"b": 1, "c": 1, "d": 2}


def test_stress_cycle_self_pairs_excluded(spark):
    # 3-cycle: every node brokers exactly the one pair of the other two;
    # closed walks (s→…→s) must not count
    out = {
        r["node"]: r["stress"]
        for r in stress_centrality(
            _edges(spark, [("a", "b"), ("b", "c"), ("c", "a")]), max_hops=6
        ).collect()
    }
    assert out == {"a": 1, "b": 1, "c": 1}


def test_eccentricity_profile(spark):
    out = {
        (r["node"]): (r["ecc"], r["n_reach"])
        for r in eccentricity_profile(_edges(spark, DIAMOND), max_hops=6).collect()
    }
    assert out == {"a": (3, 4), "b": (2, 2), "c": (2, 2), "d": (1, 1)}
    # e is a sink: no out-eccentricity row
    assert "e" not in out


def test_eccentricity_hop_bound(spark):
    out = {
        r["node"]: (r["ecc"], r["n_reach"])
        for r in eccentricity_profile(_edges(spark, DIAMOND), max_hops=2).collect()
    }
    assert out["a"] == (2, 3)


def test_anf_hyperball_exact_at_small_scale(spark):
    from aiwhispr_spark.operators.graph import anf_hyperball

    out = {
        (r["node"], r["r"]): r["ball_i"]
        for r in anf_hyperball(_edges(spark, DIAMOND), radius=3).collect()
    }
    # balls include the node itself; sink e stays at 1 for every r
    assert out[("a", 1)] == 3 and out[("a", 2)] == 4 and out[("a", 3)] == 5
    assert out[("b", 1)] == 2 and out[("b", 2)] == 3 and out[("b", 3)] == 3
    assert out[("e", 1)] == 1 and out[("e", 3)] == 1
    # monotone non-decreasing in r for every node
    for n in "abcde":
        assert out[(n, 1)] <= out[(n, 2)] <= out[(n, 3)]


def test_anf_hyperball_exact_on_long_chain(spark):
    # 60-node directed chain: ball_i(v0, r) = r+1 exactly — pins that the
    # DataSketches small-set mode stays exact well past toy sizes
    from aiwhispr_spark.operators.graph import anf_hyperball

    chain = [(f"n{i:02d}", f"n{i + 1:02d}") for i in range(59)]
    out = {
        (r["node"], r["r"]): r["ball_i"]
        for r in anf_hyperball(_edges(spark, chain), radius=6).collect()
    }
    for r in range(1, 7):
        assert out[("n00", r)] == r + 1
    assert out[("n59", 6)] == 1
