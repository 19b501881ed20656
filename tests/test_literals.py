"""Quantity-literal normalization (operators/literals.py): scale words,
comma separators, decimal exactness, no-arm sentences, plan shape.  The
hash-value gate lives in __spark_entry__ (quantity_facts vs a closed-form
DuckDB oracle)."""

from __future__ import annotations

from aiwhispr_spark.operators.literals import extract_quantity_facts


def _chunks(spark, rows):
    return spark.createDataFrame(rows, "url string, text_chunk string")


def test_scale_words_and_commas_normalize_exactly(spark):
    chunks = _chunks(
        spark,
        [
            (
                "u1",
                "Acme reported revenue of $3.5 billion. "
                "Acme employs 12,000 people. "
                "Acme margin was 7.5%. Plain prose emits nothing.",
            ),
        ],
    )
    got = {
        (r.subj, r.pred, r.value_i, r.unit)
        for r in extract_quantity_facts(chunks).collect()
    }
    assert got == {
        ("Acme", "revenue", 3_500_000_000 * 10_000, "usd"),
        ("Acme", "employees", 12_000 * 10_000, "count"),
        ("Acme", "margin", 75_000, "pct"),
    }


def test_float_hostile_decimal_is_exact(spark):
    # 0.1 billion and 1.15 thousand are float-hostile; decimal math must
    # land on the exact scaled integer
    chunks = _chunks(
        spark,
        [
            ("u1", "Beta reported revenue of $0.1 billion."),
            ("u2", "Gamma reported revenue of $1.15 thousand."),
        ],
    )
    got = {(r.subj, r.value_i) for r in extract_quantity_facts(chunks).collect()}
    assert got == {("Beta", 1_000_000_000_000), ("Gamma", 11_500_000)}


def test_quantity_no_shuffle_plan(spark):
    chunks = _chunks(spark, [("u1", "x")])
    plan = (
        extract_quantity_facts(chunks)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan


def test_sub_scale_fraction_rounds_half_up_not_floor(spark):
    # regression: a bare bigint cast FLOORED the 10^-4 boundary
    # ('7.00005%' -> 70000); the contract is HALF_UP rounding
    chunks = _chunks(spark, [("u1", "Acme margin was 7.00005%.")])
    rows = extract_quantity_facts(chunks).collect()
    assert [(r.pred, r.value_i) for r in rows] == [("margin", 70001)]
