"""Hearst hypernym mining (operators/hearst.py): list shapes, multi-word
mentions, decoys, plan purity.  The hash-value gate lives in __spark_entry__
(hearst_hypernyms vs a closed-form DuckDB oracle)."""

from __future__ import annotations

from aiwhispr_spark.operators.hearst import extract_hearst_hypernyms


def _chunks(spark, rows):
    return spark.createDataFrame(rows, "url string, text_chunk string")


def _mine(spark, text):
    rows = extract_hearst_hypernyms(_chunks(spark, [("u1", text)])).collect()
    return {(r.subj, r.pred, r.obj, r.pattern) for r in rows}


def test_such_as_oxford_list(spark):
    got = _mine(spark, "Tools such as Acme, Beta, and Gamma ship daily.")
    assert got == {
        ("Acme", "is_a", "tools", "such_as"),
        ("Beta", "is_a", "tools", "such_as"),
        ("Gamma", "is_a", "tools", "such_as"),
    }


def test_such_as_two_item_and_or_variants(spark):
    assert _mine(spark, "Cities such as Berlin and Cork grow.") == {
        ("Berlin", "is_a", "cities", "such_as"),
        ("Cork", "is_a", "cities", "such_as"),
    }
    assert _mine(spark, "Cities such as Berlin or Cork grow.") == {
        ("Berlin", "is_a", "cities", "such_as"),
        ("Cork", "is_a", "cities", "such_as"),
    }


def test_and_other_with_multiword_mention(spark):
    got = _mine(spark, "New Corp and other vendors lead the market.")
    assert got == {("New Corp", "is_a", "vendors", "and_other")}


def test_and_other_list(spark):
    got = _mine(spark, "Acme, Beta and other startups raised funds.")
    assert got == {
        ("Acme", "is_a", "startups", "and_other"),
        ("Beta", "is_a", "startups", "and_other"),
    }


def test_lowercase_list_is_no_match(spark):
    assert _mine(spark, "They ship such as promised.") == set()
    assert _mine(spark, "it works and other things too.") == set()


def test_class_is_lowercased_single_token(spark):
    got = _mine(spark, "Vendors such as Acme appear.")
    assert got == {("Acme", "is_a", "vendors", "such_as")}


def test_no_python_stage_in_plan(spark):
    df = extract_hearst_hypernyms(_chunks(spark, [("u1", "x")]))
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan and "Arrow" not in plan
