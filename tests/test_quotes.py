"""Quotation attribution (operators/quotes.py): arm coverage, pronoun
rejection, multi-word speakers, multiple quotes per chunk, plan shape.
The hash-value gate lives in __spark_entry__ (quote_attribution vs a
closed-form DuckDB oracle over the documents table)."""

from __future__ import annotations

from aiwhispr_spark.operators.quotes import extract_quotes


def _chunks(spark, rows):
    return spark.createDataFrame(rows, "url string, text_chunk string")


def test_both_arms_and_pronoun_guard(spark):
    chunks = _chunks(
        spark,
        [
            (
                "u1",
                'Acme Corp said, "We grew fast." '
                '"Margins held," said Jane Doe. '
                'It said, "ignore this pronoun quote."',
            ),
        ],
    )
    got = {(r.speaker, r.quote, r.arm) for r in extract_quotes(chunks).collect()}
    assert got == {
        ("Acme Corp", "We grew fast.", "leading"),
        ("Jane Doe", "Margins held", "trailing"),
    }


def test_multiple_quotes_per_chunk_keep_order_and_duplicates(spark):
    chunks = _chunks(
        spark,
        [
            (
                "u2",
                '"Yes," said Bob. "Yes," said Bob. '
                'Carol said, "No." Carol said, "No."',
            ),
        ],
    )
    rows = extract_quotes(chunks).collect()
    assert sorted((r.speaker, r.quote) for r in rows) == [
        ("Bob", "Yes"),
        ("Bob", "Yes"),
        ("Carol", "No."),
        ("Carol", "No."),
    ]


def test_unattributed_quote_emits_nothing(spark):
    chunks = _chunks(
        spark,
        [("u3", '"A floating quote with no verb." Plain prose after.')],
    )
    assert extract_quotes(chunks).count() == 0


def test_quotes_no_shuffle_plan(spark):
    chunks = _chunks(spark, [("u4", "x")])
    plan = extract_quotes(chunks)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
