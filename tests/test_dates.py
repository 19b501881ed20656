"""Date normalization semantics (literals.py::extract_normalize_dates):
format conventions, Gregorian validity incl. century leap rule."""

from __future__ import annotations


def test_date_formats_and_validity(spark):
    from aiwhispr_spark.operators.literals import extract_normalize_dates

    df = spark.createDataFrame(
        [
            (0, "released 1999-02-29 then March 5, 1999 and 5 March 1999"),
            (1, "on 02/29/1996 and 29.02.1900 and 29.02.2000 and 31.04.2001"),
            (2, "no dates here"),
            (3, "12/31/1999 and 31.12.1999"),
        ],
        "doc_id long, text string",
    )
    rows = {(r.id, r.raw): r for r in extract_normalize_dates(df).collect()}
    assert rows[(0, "1999-02-29")].valid_i == 0        # 1999 not leap
    assert rows[(0, "March 5, 1999")].iso == "1999-03-05"
    assert rows[(0, "5 March 1999")].iso == "1999-03-05"
    assert rows[(1, "02/29/1996")].valid_i == 1        # leap
    assert rows[(1, "29.02.1900")].valid_i == 0        # century, NOT leap
    assert rows[(1, "29.02.2000")].valid_i == 1        # 400-rule leap
    assert rows[(1, "31.04.2001")].valid_i == 0        # April has 30
    # separator keys the convention: slash = month-first, dot = day-first
    assert rows[(3, "12/31/1999")].iso == "1999-12-31"
    assert rows[(3, "31.12.1999")].iso == "1999-12-31"
    assert not any(i == 2 for (i, _) in rows)
