"""Unit gates for ontology.predicate_key_profile and ontology.owl_materialize
(the parity gates compose them over the full E1-E3 corpus; these pin the
per-rule semantics on hand graphs where the answer is enumerable)."""

from aiwhispr_spark.operators.ontology import owl_materialize, predicate_key_profile


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_key_profile_flags_and_ratios(spark):
    # f: functional AND inverse-functional? s1->o, s2->o shares the object,
    #    so max_in=2 → functional only.
    # inv: o unique per subj and subj unique per obj → both flags.
    # mn: s1->{a,b}, s2->{a} → neither (max_out=2, max_in=2).
    t = spark.createDataFrame(
        [
            ("s1", "f", "o"),
            ("s2", "f", "o"),
            ("s1", "inv", "k1"),
            ("s2", "inv", "k2"),
            ("s1", "mn", "a"),
            ("s1", "mn", "b"),
            ("s2", "mn", "a"),
            ("s1", "mn", "a"),  # duplicate assertion must not inflate counts
        ],
        "subj string, pred string, obj string",
    )
    got = {r["pred"]: r.asDict() for r in predicate_key_profile(t).collect()}
    assert got["f"]["n_facts"] == 2 and got["f"]["n_subj"] == 2
    assert got["f"]["is_functional_i"] == 1
    assert got["f"]["is_inverse_functional_i"] == 0
    assert got["f"]["func_ratio_i"] == 10000
    assert got["f"]["inv_func_ratio_i"] == 5000
    assert got["inv"]["is_functional_i"] == 1
    assert got["inv"]["is_inverse_functional_i"] == 1
    assert got["mn"]["n_facts"] == 3  # duplicate collapsed
    assert got["mn"]["is_functional_i"] == 0
    assert got["mn"]["is_inverse_functional_i"] == 0
    assert got["mn"]["max_out"] == 2 and got["mn"]["max_in"] == 2


def test_owl_materialize_rules_and_priority(spark):
    t = spark.createDataFrame(
        [
            ("a", "owns", "b"),
            ("b", "owns", "c"),
            ("c", "owns", "d"),
            ("d", "owns", "e"),
            ("x", "partnered_with", "y"),
            ("y", "partnered_with", "x"),  # reverse asserted → stays asserted
            ("x", "partnered_with", "z"),  # one-way → mirror is 'symmetric'
            ("p", "acquired", "q"),
        ],
        "subj string, pred string, obj string",
    )
    out = owl_materialize(
        t,
        symmetric=["partnered_with"],
        inverse={"acquired": "acquired_by"},
        transitive=["owns"],
        max_hops=3,
    )
    got = {(r["subj"], r["pred"], r["obj"]): r["origin"] for r in out.collect()}
    # transitive: min-hop >= 2 pairs only, bounded at 3 hops
    assert got[("a", "owns", "c")] == "transitive"
    assert got[("a", "owns", "d")] == "transitive"
    assert ("a", "owns", "e") not in got  # hop 4 > max_hops=3
    assert got[("a", "owns", "b")] == "asserted"  # hop-1 never relabels
    # symmetric: asserted beats derived; one-way mirror labels symmetric
    assert got[("y", "partnered_with", "x")] == "asserted"
    assert got[("z", "partnered_with", "x")] == "symmetric"
    # inverse
    assert got[("q", "acquired_by", "p")] == "inverse"
    assert got[("p", "acquired", "q")] == "asserted"


def test_owl_materialize_cycle_bounded(spark):
    t = spark.createDataFrame(
        [("a", "owns", "b"), ("b", "owns", "a")],
        "subj string, pred string, obj string",
    )
    out = owl_materialize(t, symmetric=[], inverse={}, transitive=["owns"], max_hops=4)
    got = {(r["subj"], r["pred"], r["obj"]): r["origin"] for r in out.collect()}
    assert got[("a", "owns", "a")] == "transitive"
    assert got[("b", "owns", "b")] == "transitive"
    assert got[("a", "owns", "b")] == "asserted"
    assert len(got) == 4
