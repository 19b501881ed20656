"""Indirect source attribution (operators/quotes.py::extract_attributions):
claim boundary at the sentence ender, pronoun-source drop, multi-word
sources.  The hash-value gate lives in __spark_entry__
(according_to_claims vs a closed-form oracle)."""

from __future__ import annotations

from aiwhispr_spark.operators.quotes import extract_attributions


def _rows(spark, text):
    df = spark.createDataFrame([("u1", text)], "url string, text_chunk string")
    return [(r.source, r.claim) for r in extract_attributions(df).collect()]


def test_claim_stops_at_sentence_end_and_pronouns_drop(spark):
    text = (
        "According to Ada Byron, revenue grew 12 percent. "
        "This next sentence must stay out. "
        "According to They, nothing holds."
    )
    assert _rows(spark, text) == [("Ada Byron", "revenue grew 12 percent")]


def test_mid_prose_and_question_enders(spark):
    text = "Preamble here. According to Beta7, margins fell sharply!"
    assert _rows(spark, text) == [("Beta7", "margins fell sharply")]
