"""Ontology type-constraint violations (operators/ontology.py): dominant-
signature election, tie-break, unknown typing, duplicate collapse.  The
hash-value gate lives in __spark_entry__ (kg_type_violations vs a DuckDB
re-derivation over closed-form facts)."""

from __future__ import annotations

from aiwhispr_spark.operators.ontology import type_constraint_violations


def _frames(spark, facts, types):
    return (
        spark.createDataFrame(facts, "subj string, pred string, obj string"),
        spark.createDataFrame(types, "entity string, etype string"),
    )


def test_dominant_signature_flags_minority(spark):
    facts = [
        ("p1", "works_for", "c1"), ("p2", "works_for", "c1"),
        ("p3", "works_for", "c2"), ("p4", "works_for", "t1"),
    ]
    types = [("p1", "person"), ("p2", "person"), ("p3", "person"),
             ("p4", "person"), ("c1", "org"), ("c2", "org"), ("t1", "place")]
    t, ty = _frames(spark, facts, types)
    got = type_constraint_violations(t, ty).collect()
    assert [(r.subj, r.obj, r.subj_type, r.obj_type, r.exp_subj_type,
             r.exp_obj_type, r.exp_n, r.n_pred) for r in got] == [
        ("p4", "t1", "person", "place", "person", "org", 3, 4)
    ]


def test_tie_breaks_on_type_names(spark):
    # 1-1 tie: (a_type, x) vs (b_type, x) -> 'a_type' wins asc
    facts = [("a1", "p", "x1"), ("b1", "p", "x2")]
    types = [("a1", "a_type"), ("b1", "b_type"), ("x1", "x"), ("x2", "x")]
    t, ty = _frames(spark, facts, types)
    got = type_constraint_violations(t, ty).collect()
    assert [(r.subj, r.subj_type, r.exp_subj_type) for r in got] == [
        ("b1", "b_type", "a_type")
    ]


def test_untyped_entities_are_unknown(spark):
    facts = [("p1", "p", "c1"), ("p2", "p", "c2"), ("zz", "p", "c3")]
    types = [("p1", "person"), ("p2", "person"),
             ("c1", "org"), ("c2", "org"), ("c3", "org")]
    t, ty = _frames(spark, facts, types)
    got = type_constraint_violations(t, ty).collect()
    assert [(r.subj, r.subj_type) for r in got] == [("zz", "unknown")]


def test_consistent_predicate_and_duplicates_silent(spark):
    facts = [("p1", "p", "c1"), ("p1", "p", "c1"), ("p2", "p", "c2")]
    types = [("p1", "person"), ("p2", "person"), ("c1", "org"), ("c2", "org")]
    t, ty = _frames(spark, facts, types)
    assert type_constraint_violations(t, ty).count() == 0
