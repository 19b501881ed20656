"""Unit gates for the KG query layer (operators/graph_query.py): BGP matching,
bounded transitive closure (min-hops), triangle enumeration, entity typing.
The sf0.01 value gates (vs DuckDB over the composed E1-E3 oracle) live in
__spark_entry__.py; these pin the operator semantics on hand-built graphs."""

import pytest
from pyspark.sql import functions as F

from aiwhispr_spark.operators.graph_query import (
    bgp_match,
    transitive_closure,
    triangle_enumerate,
    type_entities,
)


def _triples(spark, rows):
    return spark.createDataFrame(rows, "subj string, pred string, obj string")


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src string, dst string")


def test_bgp_single_pattern_constant_filter(spark):
    t = _triples(
        spark,
        [("A", "owns", "B"), ("A", "likes", "B"), ("C", "owns", "D")],
    )
    out = bgp_match(t, [("?x", "owns", "?y")])
    assert sorted(map(tuple, out.collect())) == [("A", "B"), ("C", "D")]


def test_bgp_join_on_shared_variable(spark):
    t = _triples(
        spark,
        [
            ("A", "works_for", "P1"),
            ("A", "based_in", "Berlin"),
            ("B", "works_for", "P2"),  # no based_in for B
            ("C", "based_in", "Oslo"),  # no works_for for C
        ],
    )
    out = bgp_match(t, [("?x", "works_for", "?p"), ("?x", "based_in", "?city")])
    assert set(out.columns) == {"x", "p", "city"}
    rows = out.collect()
    assert len(rows) == 1
    r = rows[0].asDict()
    assert r == {"x": "A", "p": "P1", "city": "Berlin"}


def test_bgp_three_pattern_chain_and_selectivity_order(spark):
    t = _triples(
        spark,
        [
            ("A", "works_for", "P1"),
            ("A", "based_in", "Berlin"),
            ("Z", "acquired", "A"),
            ("Z2", "acquired", "A"),
            ("Z3", "acquired", "C"),
        ],
    )
    pats = [
        ("?y", "acquired", "?x"),
        ("?x", "works_for", "?p"),
        ("?x", "based_in", "Berlin"),  # most bound — should seed the join
    ]
    out = bgp_match(t, pats)
    got = {tuple(sorted(r.asDict().items())) for r in out.collect()}
    assert got == {
        (("p", "P1"), ("x", "A"), ("y", "Z")),
        (("p", "P1"), ("x", "A"), ("y", "Z2")),
    }


def test_bgp_repeated_variable_within_pattern(spark):
    t = _triples(spark, [("A", "owns", "A"), ("A", "owns", "B")])
    out = bgp_match(t, [("?x", "owns", "?x")])
    assert [tuple(r) for r in out.collect()] == [("A",)]


def test_bgp_cross_join_when_no_shared_vars(spark):
    t = _triples(spark, [("A", "owns", "B"), ("P", "works_for", "Q")])
    out = bgp_match(t, [("?x", "owns", "?y"), ("?u", "works_for", "?v")])
    assert out.count() == 1  # 1 owns-binding × 1 works_for-binding
    assert set(out.columns) == {"x", "y", "u", "v"}


def test_bgp_empty_patterns_raises(spark):
    t = _triples(spark, [("A", "owns", "B")])
    with pytest.raises(ValueError):
        bgp_match(t, [])


def test_closure_min_hops_on_diamond(spark):
    # A→B→D, A→C→D, A→D direct: hops(A,D) must be 1 (min), not 2
    e = _edges(spark, [("A", "B"), ("B", "D"), ("A", "C"), ("C", "D"), ("A", "D")])
    out = {(r.src, r.dst): r.hops for r in transitive_closure(e, max_hops=3).collect()}
    assert out[("A", "D")] == 1
    assert out[("A", "B")] == 1 and out[("A", "C")] == 1
    assert out[("B", "D")] == 1 and out[("C", "D")] == 1
    assert len(out) == 5


def test_closure_chain_depth_and_bound(spark):
    e = _edges(spark, [("n1", "n2"), ("n2", "n3"), ("n3", "n4"), ("n4", "n5")])
    out3 = {(r.src, r.dst): r.hops for r in transitive_closure(e, 3).collect()}
    assert out3[("n1", "n4")] == 3
    assert ("n1", "n5") not in out3  # needs 4 hops, bound is 3
    out4 = {(r.src, r.dst): r.hops for r in transitive_closure(e, 4).collect()}
    assert out4[("n1", "n5")] == 4


def test_closure_cycle_terminates_and_self_pair(spark):
    e = _edges(spark, [("A", "B"), ("B", "A")])
    out = {(r.src, r.dst): r.hops for r in transitive_closure(e, 5).collect()}
    assert out == {("A", "B"): 1, ("B", "A"): 1, ("A", "A"): 2, ("B", "B"): 2}


def test_closure_early_stop_beyond_diameter(spark):
    e = _edges(spark, [("A", "B")])
    # max_hops far past the diameter: early-stop, result unchanged
    out = transitive_closure(e, 50).collect()
    assert [(r.src, r.dst, r.hops) for r in out] == [("A", "B", 1)]


def test_triangles_canonical_and_deduped(spark):
    # triangle A-B-C given with mixed directions + duplicate edges + a dangler
    e = _edges(
        spark,
        [("B", "A"), ("B", "C"), ("A", "C"), ("C", "A"), ("C", "D"), ("A", "A")],
    )
    out = [tuple(r) for r in triangle_enumerate(e).collect()]
    assert out == [("A", "B", "C")]


def test_triangles_two_adjacent(spark):
    e = _edges(
        spark, [("A", "B"), ("B", "C"), ("A", "C"), ("C", "D"), ("B", "D")]
    )
    out = sorted(tuple(r) for r in triangle_enumerate(e).collect())
    assert out == [("A", "B", "C"), ("B", "C", "D")]


def test_type_entities_precedence(spark):
    t = _triples(
        spark,
        [
            # relational place evidence beats the corp suffix on the OBJECT
            ("E7 Corp", "based_in", "Berlin Corp"),
            # relational person evidence
            ("E7 Corp", "founded_by", "Ada Byron"),
            # surface org
            ("E7 Corp", "owns", "Acme Inc"),
            # surface person-shape (never a person-predicate object)
            ("Grace Hopper", "owns", "Entity_3"),
        ],
    )
    got = {r.entity: r.etype for r in type_entities(t).collect()}
    assert got == {
        "E7 Corp": "org",
        "Berlin Corp": "place",  # rule 1 wins over corp suffix
        "Ada Byron": "person",
        "Acme Inc": "org",
        "Grace Hopper": "person",  # surface shape, rule 4
        "Entity_3": "other",
    }


def test_type_entities_every_mention_appears_once(spark):
    t = _triples(
        spark,
        [("A", "owns", "B"), ("B", "owns", "A"), ("A", "based_in", "Lima")],
    )
    out = type_entities(t)
    assert out.count() == out.select("entity").distinct().count() == 3


def test_predicate_profile_signatures_and_counts(spark):
    from aiwhispr_spark.operators.graph_query import predicate_profile

    triples = spark.createDataFrame(
        [
            ("Acme Corp", "based_in", "Berlin"),
            ("Acme Corp", "based_in", "Paris"),
            ("Zeta Corp", "based_in", "Berlin"),
            ("Acme Corp", "founded_by", "Ada Byron"),
        ],
        "subj string, pred string, obj string",
    )
    got = {
        (r.pred, r.subj_type, r.obj_type): (r.n_triples, r.n_subj, r.n_obj)
        for r in predicate_profile(triples).collect()
    }
    # Berlin/Paris type as place (based_in objects), Ada Byron as person
    # (founded_by object), both Corps as org (surface suffix).
    assert got == {
        ("based_in", "org", "place"): (3, 2, 2),
        ("founded_by", "org", "person"): (1, 1, 1),
    }


def test_predicate_profile_accepts_curated_type_table(spark):
    from aiwhispr_spark.operators.graph_query import predicate_profile

    triples = spark.createDataFrame(
        [("a", "p", "b")], "subj string, pred string, obj string"
    )
    types = spark.createDataFrame(
        [("a", "T1"), ("b", "T2")], "entity string, etype string"
    )
    [row] = predicate_profile(triples, types=types).collect()
    assert (row.pred, row.subj_type, row.obj_type, row.n_triples) == (
        "p",
        "T1",
        "T2",
        1,
    )


def test_bgp_optional_keeps_unmatched_with_nulls(spark):
    from aiwhispr_spark.operators.graph_query import bgp_match_optional

    t = spark.createDataFrame(
        [
            ("A", "acquired", "B"),
            ("A", "acquired", "C"),
            ("B", "based_in", "Berlin"),
        ],
        "subj string, pred string, obj string",
    )
    out = bgp_match_optional(
        t, [("?y", "acquired", "?x")], [[("?x", "based_in", "?city")]]
    )
    got = {(r.y, r.x, r.city) for r in out.collect()}
    assert got == {("A", "B", "Berlin"), ("A", "C", None)}


def test_bgp_optional_requires_shared_variable(spark):
    from aiwhispr_spark.operators.graph_query import bgp_match_optional

    t = spark.createDataFrame(
        [("A", "p", "B")], "subj string, pred string, obj string"
    )
    with pytest.raises(ValueError):
        bgp_match_optional(t, [("?x", "p", "?y")], [[("?a", "q", "?b")]])


def test_property_path_sequence_alternation_inverse_plus(spark):
    from aiwhispr_spark.operators.graph_query import property_path

    t = spark.createDataFrame(
        [
            ("CorpA", "founded_by", "Ada"),   # ^founded_by: Ada -> CorpA
            ("CorpA", "owns", "CorpB"),
            ("CorpB", "acquired", "CorpC"),   # (owns|acquired)+: A->B, A->C, B->C
            ("CorpB", "based_in", "Berlin"),
            ("CorpC", "based_in", "Cork"),
            ("CorpA", "based_in", "Aix"),     # src itself: NOT reachable via +
        ],
        "subj string, pred string, obj string",
    )
    out = property_path(t, "^founded_by/(owns|acquired)+/based_in")
    got = {(r.src, r.dst) for r in out.collect()}
    assert got == {("Ada", "Berlin"), ("Ada", "Cork")}


def test_property_path_single_forward_step_is_the_edge_set(spark):
    from aiwhispr_spark.operators.graph_query import property_path

    t = spark.createDataFrame(
        [("A", "p", "B"), ("A", "p", "B"), ("A", "q", "C")],
        "subj string, pred string, obj string",
    )
    assert {(r.src, r.dst) for r in property_path(t, "p").collect()} == {("A", "B")}


def test_property_path_plus_bounded_by_max_hops(spark):
    from aiwhispr_spark.operators.graph_query import property_path

    chain = [(f"n{i}", "p", f"n{i+1}") for i in range(5)]
    t = spark.createDataFrame(chain, "subj string, pred string, obj string")
    got = {(r.src, r.dst) for r in property_path(t, "p+", max_hops=2).collect()}
    assert ("n0", "n2") in got and ("n0", "n3") not in got


def test_property_path_inverse_of_group(spark):
    # regression: '^(p1|p2)' used to fail the paren strip (the '^' check ran
    # second), leaving alts ['(p1', 'p2)'] that silently matched nothing
    from aiwhispr_spark.operators.graph_query import property_path

    t = spark.createDataFrame(
        [
            ("CorpA", "owns", "CorpB"),
            ("CorpC", "acquired", "CorpB"),
            ("CorpA", "based_in", "Aix"),
            ("CorpC", "based_in", "Cork"),
        ],
        "subj string, pred string, obj string",
    )
    got = {
        (r.src, r.dst)
        for r in property_path(t, "^(owns|acquired)/based_in").collect()
    }
    assert got == {("CorpB", "Aix"), ("CorpB", "Cork")}
    closure = {
        (r.src, r.dst) for r in property_path(t, "^(owns|acquired)+").collect()
    }
    assert closure == {("CorpB", "CorpA"), ("CorpB", "CorpC")}


def test_property_path_malformed_step_raises(spark):
    import pytest

    from aiwhispr_spark.operators.graph_query import property_path

    t = spark.createDataFrame(
        [("A", "p", "B")], "subj string, pred string, obj string"
    )
    for bad in ("(owns", "ow^ns", "(a|b))"):
        with pytest.raises(ValueError):
            property_path(t, bad)


def test_bgp_optional_chained_on_optional_var_raises(spark):
    # SPARQL compatible-mapping vs Spark NULL-key divergence: re-binding a
    # previous optional's variable is outside the documented subset
    import pytest

    from aiwhispr_spark.operators.graph_query import bgp_match_optional

    t = _triples(
        spark,
        [
            ("Y", "acquired", "X"),
            ("X", "based_in", "C1"),
            ("C1", "in_country", "K"),
        ],
    )
    with pytest.raises(ValueError, match="previous optional"):
        bgp_match_optional(
            t,
            [("?y", "acquired", "?x")],
            [
                [("?x", "based_in", "?city")],
                [("?city", "in_country", "?c")],
            ],
        )


def test_local_clustering_coefficient_triangle_plus_pendant(spark):
    from aiwhispr_spark.operators.graph_query import local_clustering_coefficient

    # K3 on {a,b,c} plus pendant d-a; duplicates/direction must collapse
    edges = spark.createDataFrame(
        [("a", "b"), ("b", "a"), ("b", "c"), ("a", "c"), ("d", "a")],
        "src string, dst string",
    )
    got = {r.node: r for r in local_clustering_coefficient(edges).collect()}
    assert (got["a"].deg, got["a"].n_tri, got["a"].lcc_i) == (3, 1, 333333)
    assert (got["b"].deg, got["b"].n_tri, got["b"].lcc_i) == (2, 1, 1000000)
    assert (got["c"].deg, got["c"].n_tri, got["c"].lcc_i) == (2, 1, 1000000)
    assert (got["d"].deg, got["d"].n_tri, got["d"].lcc_i) == (1, 0, 0)


def test_community_modularity_perfect_and_mixed_split(spark):
    from aiwhispr_spark.operators.graph_query import community_modularity

    # two triangles joined by one bridge edge; labels = the two triangles
    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("a", "c"),
         ("x", "y"), ("y", "z"), ("x", "z"), ("c", "x")],
        "src string, dst string",
    )
    labels = spark.createDataFrame(
        [("a", "A"), ("b", "A"), ("c", "A"), ("x", "B"), ("y", "B"), ("z", "B")],
        "node string, label string",
    )
    got = {r.label: r for r in community_modularity(edges, labels).collect()}
    # m=7; community A: e_in=3, d_sum=2+2+3=7 -> q_num=4*7*3-49=35; B same
    for lab in ("A", "B"):
        r = got[lab]
        assert (r.n_nodes, r.e_in, r.d_sum, r.m, r.q_num) == (3, 3, 7, 7, 35)
    # Q = (35+35)/(4*49) = 0.357... > 0: the partition beats random
    assert sum(r.q_num for r in got.values()) > 0


def test_community_modularity_drops_unlabeled(spark):
    from aiwhispr_spark.operators.graph_query import community_modularity

    edges = spark.createDataFrame(
        [("a", "b"), ("b", "u")], "src string, dst string"
    )
    labels = spark.createDataFrame([("a", "A"), ("b", "A")], "node string, label string")
    rows = community_modularity(edges, labels).collect()
    assert len(rows) == 1
    r = rows[0]
    # u unlabeled: its edge never counts in e_in, its degree never in d_sum
    assert (r.n_nodes, r.e_in, r.d_sum, r.m, r.q_num) == (2, 1, 3, 2, 4 * 2 * 1 - 9)


def test_bgp_aggregate_group_and_having(spark):
    from aiwhispr_spark.operators.graph_query import bgp_aggregate

    rows = [
        ("e1", "based_in", "Berlin"), ("e2", "based_in", "Berlin"),
        ("e3", "based_in", "Paris"),
        ("a1", "acquired", "e1"), ("a2", "acquired", "e1"),
        ("a1", "acquired", "e2"), ("a1", "acquired", "e3"),
    ]
    t = spark.createDataFrame(rows, "subj string, pred string, obj string")
    got = {
        r.city: (r.n_targets, r.n_acquirers)
        for r in bgp_aggregate(
            t,
            [("?x", "based_in", "?city"), ("?y", "acquired", "?x")],
            ["city"],
            {"n_targets": "x", "n_acquirers": "y"},
            having_min=2,
        ).collect()
    }
    # Paris has only 1 acquired target -> HAVING drops it
    assert got == {"Berlin": (2, 2)}


def test_bgp_aggregate_param_guards(spark):
    import pytest

    from aiwhispr_spark.operators.graph_query import bgp_aggregate

    t = spark.createDataFrame([("a", "p", "b")], "subj string, pred string, obj string")
    with pytest.raises(ValueError):
        bgp_aggregate(t, [("?x", "p", "?y")], [], {"n": "x"})
    with pytest.raises(ValueError):
        bgp_aggregate(t, [("?x", "p", "?y")], ["x"], {})


def test_bgp_construct_set_semantics_and_unbound_raise(spark):
    from aiwhispr_spark.operators.graph_query import bgp_construct

    t = spark.createDataFrame(
        [
            ("a", "acquired", "x"),
            ("b", "acquired", "x"),
            ("x", "based_in", "berlin"),
        ],
        "subj string, pred string, obj string",
    )
    out = bgp_construct(
        t,
        where=[("?y", "acquired", "?x"), ("?x", "based_in", "?c")],
        template=[("?y", "controls", "?x"), ("?x", "located_in", "?c")],
    )
    got = sorted((r.subj, r.pred, r.obj) for r in out.collect())
    # located_in instantiated per solution but DISTINCT collapses the dup
    assert got == [
        ("a", "controls", "x"),
        ("b", "controls", "x"),
        ("x", "located_in", "berlin"),
    ]
    import pytest

    with pytest.raises(ValueError):  # typo'd template var must not silently drop
        bgp_construct(t, [("?y", "acquired", "?x")], [("?y", "controls", "?z")])
    with pytest.raises(ValueError):
        bgp_construct(t, [("?y", "acquired", "?x")], [])


def test_community_conductance_hand_computed(spark):
    from aiwhispr_spark.operators.graph_query import community_conductance

    # two triangles bridged by one edge: each community vol=7 (3 internal
    # edges ×2 + 1 bridge endpoint), cut=1, 2m=14 -> phi = 1e6 // 7
    edges = spark.createDataFrame(
        [("a1", "a2"), ("a2", "a3"), ("a3", "a1"),
         ("b1", "b2"), ("b2", "b3"), ("b3", "b1"),
         ("a1", "b1"), ("b1", "a1")],  # duplicate reversed bridge: canonicalized
        "src string, dst string",
    )
    labels = spark.createDataFrame(
        [(n, "A") for n in ("a1", "a2", "a3")] + [(n, "B") for n in ("b1", "b2", "b3")],
        "node string, label string",
    )
    got = {r.label: r for r in community_conductance(edges, labels).collect()}
    for lab in ("A", "B"):
        r = got[lab]
        assert (r.n_nodes, r.vol, r.internal_edges, r.cut_edges) == (3, 7, 3, 1)
        assert r.conductance_mi == 1_000_000 // 7

    # whole-graph community: min(vol, 2m-vol) = 0 -> sentinel
    one = spark.createDataFrame(
        [(n, "ALL") for n in ("a1", "a2", "a3", "b1", "b2", "b3")],
        "node string, label string",
    )
    [r] = community_conductance(edges, one).collect()
    assert r.conductance_mi == -1 and r.cut_edges == 0
