"""Collective ER candidates (operators/canonicalize.py::
attribute_merge_candidates): stop-fact exclusion (max_df), min_shared cut,
jaccard over discriminative facts, duplicate-fact idempotence.  The
hash-value gate lives in __spark_entry__ (kg_attribute_merge vs a
closed-form pair oracle)."""

from __future__ import annotations

from aiwhispr_spark.operators.canonicalize import attribute_merge_candidates


def _cands(spark, rows, **kw):
    df = spark.createDataFrame(rows, "subj string, pred string, obj string")
    return {
        (r.a, r.b): (r.n_shared, r.n_facts_a, r.n_facts_b, r.jaccard_i)
        for r in attribute_merge_candidates(df, **kw).collect()
    }


def test_shared_facts_merge_and_min_shared_cuts(spark):
    rows = [
        ("A", "works_for", "C1"), ("A", "located_in", "T1"), ("A", "owns", "P1"),
        ("B", "works_for", "C1"), ("B", "located_in", "T1"),
        ("C", "works_for", "C1"),  # shares only 1 fact with A and B
    ]
    got = _cands(spark, rows, min_shared=2, max_df=10)
    # A∩B = 2, |A|=3, |B|=2, union = 3 -> jaccard 2/3
    assert got == {("A", "B"): (2, 3, 2, 666666)}


def test_stop_facts_above_max_df_carry_no_evidence(spark):
    # every subject is based_in Berlin (df=4 > max_df=3): pairs sharing only
    # Berlin emit nothing, and Berlin never counts toward sizes or overlap
    rows = [(s, "based_in", "Berlin") for s in "ABCD"] + [
        ("A", "works_for", "C1"), ("A", "located_in", "T1"),
        ("B", "works_for", "C1"), ("B", "located_in", "T1"),
    ]
    got = _cands(spark, rows, min_shared=2, max_df=3)
    assert got == {("A", "B"): (2, 2, 2, 1000000)}


def test_duplicate_fact_rows_count_once(spark):
    rows = [
        ("A", "works_for", "C1"), ("A", "works_for", "C1"),
        ("B", "works_for", "C1"), ("A", "located_in", "T1"),
        ("B", "located_in", "T1"),
    ]
    got = _cands(spark, rows, min_shared=2, max_df=10)
    assert got == {("A", "B"): (2, 2, 2, 1000000)}
