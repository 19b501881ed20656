"""Flesch readability signals (operators/textstats.py::readability_scores):
hand-computed counts/scores, the vowel-group syllable rule, sentence floor,
and NULL-score wordless docs.  The hash-value gate lives in __spark_entry__
(readability_scores vs the byte-same counting rules in DuckDB)."""

from __future__ import annotations

from aiwhispr_spark.operators.textstats import readability_scores


def _scores(spark, rows):
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    return {r.doc_id: r.asDict() for r in readability_scores(df).collect()}


def test_hand_computed_counts_and_scores(spark):
    got = _scores(spark, [(1, "The cat sat. It ran!")])
    r = got[1]
    assert (r["n_words"], r["n_sentences"], r["n_syllables"]) == (5, 2, 5)
    # fk = 390000*5 div 2 + 11800000*5 div 5 - 15590000
    assert r["fk_grade_i"] == 975000 + 11800000 - 15590000
    # fre = 206835000 - 1015000*5 div 2 - 84600000*5 div 5
    assert r["fre_i"] == 206835000 - 2537500 - 84600000


def test_vowel_group_syllables_and_floor(spark):
    got = _scores(spark, [(1, "beautiful rhythm")])
    # beautiful -> eau/i/u = 3 groups; rhythm -> y = 1 group
    assert got[1]["n_syllables"] == 4
    # no sentence punctuation -> floored at 1
    assert got[1]["n_sentences"] == 1


def test_wordless_doc_emits_null_scores(spark):
    got = _scores(spark, [(1, ""), (2, "   ")])
    for i in (1, 2):
        assert got[i]["n_words"] == 0
        assert got[i]["n_syllables"] == 0
        assert got[i]["fk_grade_i"] is None
        assert got[i]["fre_i"] is None
