"""Unit gates for the bowtie decomposition (graph_query.py::bowtie_structure)
and list-co-occurrence set expansion (structured.py::colist_expansion).  The
sf0.01 value gates live in __spark_entry__.py; these pin semantics on
hand-built inputs, including the class-precedence contract."""

from pyspark.sql import functions as F

from aiwhispr_spark.operators.graph_query import bowtie_structure
from aiwhispr_spark.operators.structured import colist_expansion


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src string, dst string")


def _classes(spark, pairs, max_hops=6):
    out = bowtie_structure(_edges(spark, pairs), max_hops=max_hops)
    return {r["node"]: r["cls"] for r in out.collect()}


def test_bowtie_fixture_classes(spark):
    from __spark_entry__ import _BOWTIE_EXPECTED, _bowtie_fixture_edges

    got = _classes(spark, _bowtie_fixture_edges())
    want = {n: cls for cls, ms in _BOWTIE_EXPECTED.items() for n in ms}
    assert got == want


def test_bowtie_largest_scc_tiebreak_min_id(spark):
    # two 2-node SCCs, no other structure: the one with the smaller min
    # node id is elected CORE; the other is DISCONNECTED (separate weak
    # component)
    got = _classes(spark, [("b", "c"), ("c", "b"), ("x", "y"), ("y", "x")])
    assert got == {"b": "CORE", "c": "CORE", "x": "DISCONNECTED", "y": "DISCONNECTED"}


def test_bowtie_pure_dag_core_is_singleton(spark):
    # no cycle at all: every SCC is a singleton; the min node wins CORE and
    # the chain behind/ahead classifies IN/OUT around it
    got = _classes(spark, [("a", "b"), ("b", "c")])
    assert got == {"a": "CORE", "b": "OUT", "c": "OUT"}


def test_bowtie_hop_bound_truncates_reach(spark):
    # chain core -> x1 -> x2 -> x3: with max_hops=1 only x1 is OUT; the
    # rest are weakly connected within 1 undirected hop of... x2 is 2 hops
    # away even undirected, so it falls to DISCONNECTED under the bound —
    # the documented closure contract (bound must cover the diameter)
    pairs = [("a", "b"), ("b", "a"), ("b", "x1"), ("x1", "x2")]
    got = _classes(spark, pairs, max_hops=1)
    assert got["a"] == "CORE" and got["b"] == "CORE"
    assert got["x1"] == "OUT"
    assert got["x2"] == "DISCONNECTED"
    got6 = _classes(spark, pairs, max_hops=6)
    assert got6["x2"] == "OUT"


def _memberships(spark, rows):
    return spark.createDataFrame(rows, "list_id string, item string")


def test_colist_expansion_scores_and_excludes_seeds(spark):
    m = _memberships(
        spark,
        [
            ("L1", "seed"), ("L1", "a"), ("L1", "b"),
            ("L2", "seed"), ("L2", "a"),
            ("L3", "a"), ("L3", "c"),   # no seed: c never qualifies
            ("L1", "a"),                 # duplicate membership: counted once
        ],
    )
    rows = {r["item"]: r for r in colist_expansion(m, ["seed"]).collect()}
    assert set(rows) == {"a", "b"}          # c unshared, seed excluded
    assert rows["a"]["n_shared_lists"] == 2
    assert rows["a"]["n_lists"] == 3
    assert rows["a"]["support_i"] == 666666
    assert rows["b"]["n_shared_lists"] == 1
    assert rows["b"]["n_lists"] == 1
    assert rows["b"]["support_i"] == 1000000


def test_colist_expansion_min_lists_floor(spark):
    m = _memberships(
        spark,
        [("L1", "s"), ("L1", "a"), ("L1", "b"), ("L2", "s"), ("L2", "a")],
    )
    rows = colist_expansion(m, ["s"], min_lists=2).collect()
    assert {r["item"] for r in rows} == {"a"}


def test_condensation_contracts_and_levels(spark):
    from aiwhispr_spark.operators.graph_query import condensation_dag

    # 2-cycle {a,b} → c → d, plus x → a: levels x=0, {a,b}=1, c=2, d=3
    out = {
        r["scc_id"]: (r["n_members"], r["level"])
        for r in condensation_dag(
            _edges(
                spark,
                [("a", "b"), ("b", "a"), ("b", "c"), ("c", "d"), ("x", "a")],
            ),
            max_hops=6,
        ).collect()
    }
    assert out == {"x": (1, 0), "a": (2, 1), "c": (1, 2), "d": (1, 3)}


def test_condensation_single_scc_is_level_zero(spark):
    from aiwhispr_spark.operators.graph_query import condensation_dag

    out = condensation_dag(
        _edges(spark, [("a", "b"), ("b", "c"), ("c", "a")]), max_hops=6
    ).collect()
    assert [(r["scc_id"], r["n_members"], r["level"]) for r in out] == [
        ("a", 3, 0)
    ]
