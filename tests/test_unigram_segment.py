"""Unigram-LM Viterbi segmentation semantics (textstats.py::
unigram_viterbi_segment): min-cost choice, structural tie-break,
char fallback, unsegmentable sentinel."""

from __future__ import annotations


def _seg(spark, words, vocab):
    from aiwhispr_spark.operators.textstats import unigram_viterbi_segment

    df = spark.createDataFrame([(w,) for w in words], "word string")
    return {r.word: r for r in unigram_viterbi_segment(df, vocab).collect()}


def test_viterbi_merge_beats_chars(spark):
    vocab = {"a": 10, "b": 10, "t": 10, "l": 10, "e": 10, "table": 18,
             "ta": 11, "ble": 14}
    out = _seg(spark, ["table"], vocab)
    r = out["table"]
    # whole-word 18 < ta+ble 25 < chars 50
    assert (r.pieces, r.cost, r.n_pieces) == ("table", 18, 1)


def test_viterbi_tie_breaks_fewer_pieces_then_lex(spark):
    # two covers with EQUAL cost: 'ab'+'cd' (10+10) vs 'abcd' absent;
    # vs 'a'+'bcd' (5+15) — equal 20, but 2 pieces either way →
    # lexicographic piece-sequence decides: 'a bcd' < 'ab cd'
    vocab = {"ab": 10, "cd": 10, "a": 5, "bcd": 15, "b": 99, "c": 99, "d": 99}
    r = _seg(spark, ["abcd"], vocab)["abcd"]
    assert r.cost == 20 and r.n_pieces == 2
    assert r.pieces == "a bcd"
    # fewer pieces beats lex when counts differ at equal cost
    vocab2 = {"xyz": 30, "x": 10, "y": 10, "z": 10}
    r2 = _seg(spark, ["xyz"], vocab2)["xyz"]
    assert r2.pieces == "xyz" and r2.n_pieces == 1


def test_viterbi_unsegmentable_sentinel(spark):
    r = _seg(spark, ["q!"], {"q": 10})["q!"]
    assert (r.cost, r.n_pieces, r.pieces) == (-1, -1, "")


def test_viterbi_dedups_input_words(spark):
    from aiwhispr_spark.operators.textstats import unigram_viterbi_segment

    df = spark.createDataFrame([("aa",), ("aa",), ("aa",)], "word string")
    assert unigram_viterbi_segment(df, {"a": 10, "aa": 15}).count() == 1
