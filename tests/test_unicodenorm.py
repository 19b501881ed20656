"""Unicode normalization tests (operators/unicodenorm.py) — NFC arm is
hash-gated vs DuckDB in the driver (`unicode_nfc_normalize`); NFKC/NFD and
the changed_i contract are pinned here (DuckDB only ships NFC)."""

import unicodedata

import pytest

from aiwhispr_spark.operators.unicodenorm import normalize_text, normalize_udf

DECOMPOSED = "cafe\u0301"          # e + combining acute
PRECOMPOSED = "caf\u00e9"
LIGATURE = "\ufb01ne \uff21\uff22"  # fi-ligature + fullwidth AB


def test_nfc_composes_and_flags(spark):
    df = spark.createDataFrame(
        [(1, DECOMPOSED), (2, PRECOMPOSED), (3, None)],
        "doc_id long, text string",
    )
    rows = {r.doc_id: r for r in normalize_text(df).collect()}
    assert rows[1]["text"] == PRECOMPOSED and rows[1]["changed_i"] == 1
    assert rows[2]["text"] == PRECOMPOSED and rows[2]["changed_i"] == 0
    assert rows[3]["text"] is None and rows[3]["changed_i"] is None


def test_out_col_keeps_original(spark):
    df = spark.createDataFrame([(1, DECOMPOSED)], "doc_id long, text string")
    r = normalize_text(df, out_col="text_nfc").first()
    assert r["text"] == DECOMPOSED          # original untouched
    assert r["text_nfc"] == PRECOMPOSED
    assert r["changed_i"] == 1


def test_nfkc_folds_compatibility_chars(spark):
    df = spark.createDataFrame([(1, LIGATURE)], "doc_id long, text string")
    r = normalize_text(df, form="NFKC").first()
    assert r["text"] == "fine AB"
    # NFC must NOT fold the same input (compatibility-stable)
    r2 = normalize_text(df, form="NFC").first()
    assert r2["text"] == LIGATURE


def test_matches_python_reference_all_forms(spark):
    samples = [DECOMPOSED, PRECOMPOSED, LIGATURE, "한", "ascii"]
    df = spark.createDataFrame(
        [(i, s) for i, s in enumerate(samples)], "doc_id long, text string"
    )
    for form in ("NFC", "NFKC", "NFD", "NFKD"):
        got = {
            r.doc_id: r["text"] for r in normalize_text(df, form=form).collect()
        }
        for i, s in enumerate(samples):
            assert got[i] == unicodedata.normalize(form, s), (form, i)


def test_bad_form_rejected():
    with pytest.raises(ValueError):
        normalize_udf("NFX")


def test_narrow_plan_no_shuffle(spark):
    df = spark.range(5).selectExpr("id as doc_id", "'x' as text")
    plan = normalize_text(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
