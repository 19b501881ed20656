"""AMIE-style horn-rule mining (operators/rulemine.py): metric arithmetic,
PCA vs standard confidence split, distinct-pair collapse, support and
head-frequency cuts.  The hash-value gate lives in __spark_entry__
(kg_horn_rules vs a DuckDB re-derivation over the same closed-form facts)."""

from __future__ import annotations

from aiwhispr_spark.operators.rulemine import mine_horn_rules


def _triples(spark, rows):
    return spark.createDataFrame(rows, "subj string, pred string, obj string")


def _rules(spark, rows, **kw):
    return {
        (r.body1, r.body2, r.head): (
            r.support, r.n_body, r.n_head, r.n_pca,
            r.conf_i, r.hc_i, r.pca_conf_i,
        )
        for r in mine_horn_rules(_triples(spark, rows), **kw).collect()
    }


def test_hand_computed_rule_metrics(spark):
    # works_for(p, c) ∧ located_in(c, t) ⇒ lives_in(p, t)
    rows = [
        ("p1", "works_for", "c1"), ("p2", "works_for", "c1"),
        ("p3", "works_for", "c2"), ("p4", "works_for", "c2"),
        ("c1", "located_in", "t1"), ("c2", "located_in", "t2"),
        # p1, p2 agree with the rule; p3 lives elsewhere; p4 has NO fact
        ("p1", "lives_in", "t1"), ("p2", "lives_in", "t1"),
        ("p3", "lives_in", "t9"),
    ]
    got = _rules(spark, rows)
    # body pairs: (p1,t1) (p2,t1) (p3,t2) (p4,t2) -> n_body=4; support=2;
    # n_head=3; PCA: p4 has no lives_in fact -> n_pca=3
    assert got == {
        ("works_for", "located_in", "lives_in"): (2, 4, 3, 3, 5000, 6666, 6666)
    }


def test_duplicate_facts_and_pairs_count_once(spark):
    # two companies both in t1: (p1, t1) is ONE body pair, not two
    rows = [
        ("p1", "works_for", "c1"), ("p1", "works_for", "c2"),
        ("c1", "located_in", "t1"), ("c2", "located_in", "t1"),
        ("p1", "lives_in", "t1"), ("p1", "lives_in", "t1"),
        ("p2", "works_for", "c1"), ("p2", "lives_in", "t1"),
    ]
    got = _rules(spark, rows)
    key = ("works_for", "located_in", "lives_in")
    support, n_body, n_head, n_pca = got[key][:4]
    assert (support, n_body, n_head, n_pca) == (2, 2, 2, 2)


def test_min_support_and_head_frequency_cuts(spark):
    rows = [
        ("p1", "works_for", "c1"), ("c1", "located_in", "t1"),
        ("p1", "lives_in", "t1"),
    ]
    assert _rules(spark, rows, min_support=2) == {}
    assert _rules(spark, rows, min_support=1, min_head_facts=2) == {}
    assert len(_rules(spark, rows, min_support=1)) == 1


def test_zero_support_bodies_never_emit(spark):
    # a wedge exists (works_for ∘ located_in) but no head fact joins it
    rows = [("p1", "works_for", "c1"), ("c1", "located_in", "t1")]
    assert _rules(spark, rows, min_support=1) == {}
