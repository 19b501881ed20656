"""Predicate-paraphrase detection (operators/paraphrase.py): overlap math,
duplicate-triple collapse, min_common cut.  The hash-value gate lives in
__spark_entry__ (kg_predicate_paraphrases vs a closed-form DuckDB oracle)."""

from __future__ import annotations

from aiwhispr_spark.operators.paraphrase import predicate_paraphrases


def _triples(spark, rows):
    return spark.createDataFrame(rows, "subj string, pred string, obj string")


def test_overlap_and_jaccard_exact(spark):
    rows = [
        ("a", "acquired", "x"), ("b", "acquired", "y"), ("c", "acquired", "z"),
        ("a", "bought", "x"), ("b", "bought", "y"),
        ("a", "owns", "q"),
    ]
    got = {
        (r.pred_a, r.pred_b, r.n_common, r.n_a, r.n_b, r.jaccard_i)
        for r in predicate_paraphrases(_triples(spark, rows)).collect()
    }
    # acquired: 3 pairs; bought: 2; common 2 -> 2*10000 div 3 = 6666
    assert got == {("acquired", "bought", 2, 3, 2, 6666)}


def test_duplicate_triples_count_once(spark):
    rows = [("a", "p", "x"), ("a", "p", "x"), ("a", "q", "x")]
    got = predicate_paraphrases(_triples(spark, rows)).collect()
    assert [(r.n_common, r.n_a, r.n_b, r.jaccard_i) for r in got] == [(1, 1, 1, 10000)]


def test_min_common_cut(spark):
    rows = [("a", "p", "x"), ("a", "q", "x"), ("b", "p", "y"), ("b", "q", "y")]
    assert predicate_paraphrases(_triples(spark, rows), min_common=3).count() == 0
    out = predicate_paraphrases(_triples(spark, rows), min_common=2).collect()
    assert [(r.pred_a, r.pred_b, r.n_common) for r in out] == [("p", "q", 2)]


def test_same_subject_different_object_no_match(spark):
    rows = [("a", "p", "x"), ("a", "q", "y")]
    assert predicate_paraphrases(_triples(spark, rows)).count() == 0


def test_inverse_predicates_hand_computed(spark):
    from aiwhispr_spark.operators.paraphrase import inverse_predicates

    rows = [
        ("a", "acquired", "x"), ("b", "acquired", "y"), ("c", "acquired", "z"),
        ("x", "acquired_by", "a"), ("y", "acquired_by", "b"),
        ("z", "acquired_by", "q"),  # junk: not a mirror of anything
        ("a", "partner", "b"), ("b", "partner", "a"),  # fully symmetric
    ]
    got = {
        (r.pred_a, r.pred_b, r.n_common, r.n_a, r.n_b, r.inv_score_i)
        for r in inverse_predicates(_triples(spark, rows)).collect()
    }
    # acquired(3) vs acquired_by(3): mirrors on a/x and b/y -> 2 of min 3
    # partner diagonal: both directed facts mirrored -> 2 of 2
    assert got == {
        ("acquired", "acquired_by", 2, 3, 3, 6666),
        ("partner", "partner", 2, 2, 2, 10000),
    }


def test_inverse_predicates_self_loop_counts_on_diagonal(spark):
    from aiwhispr_spark.operators.paraphrase import inverse_predicates

    rows = [("a", "sees", "a"), ("b", "sees", "c")]
    got = inverse_predicates(_triples(spark, rows)).collect()
    # self-loop mirrors itself; (b, c) has no mirror -> 1 of min(2, 2)
    assert [(r.pred_a, r.pred_b, r.n_common, r.inv_score_i) for r in got] == [
        ("sees", "sees", 1, 5000)
    ]


def test_inverse_predicates_duplicates_collapse_and_cut(spark):
    from aiwhispr_spark.operators.paraphrase import inverse_predicates

    rows = [("a", "p", "x"), ("a", "p", "x"), ("x", "r", "a"), ("x", "r", "a")]
    out = inverse_predicates(_triples(spark, rows)).collect()
    assert [(r.pred_a, r.pred_b, r.n_common, r.n_a, r.n_b) for r in out] == [
        ("p", "r", 1, 1, 1)
    ]
    assert inverse_predicates(_triples(spark, rows), min_common=2).count() == 0
