"""Acronym-alias mining (canonicalize.py::mine_acronym_aliases): prefix
self-trim, initial verification, short-run guard, mention counting.  The
hash-value gate lives in __spark_entry__ (acronym_alias_pairs vs a
closed-form DuckDB oracle over the documents table)."""

from __future__ import annotations

from aiwhispr_spark.operators.canonicalize import mine_acronym_aliases


def _chunks(spark, rows):
    return spark.createDataFrame(rows, "url string, text_chunk string")


def test_prefix_trims_and_initials_verify(spark):
    chunks = _chunks(
        spark,
        [
            # "The" is part of the capitalized run but not the acronym —
            # the last-k-token rule trims it
            ("u1", "The World Health Organization (WHO) met."),
            # initials mismatch → dropped, no fuzzy back-off
            ("u2", "Broken Name Zone (BNQ) is noise."),
            # run shorter than the acronym → dropped
            ("u3", "Tiny Run (TRX) stays out."),
        ],
    )
    rows = mine_acronym_aliases(chunks).collect()
    assert [(r.long_form, r.acronym, r.n_mentions) for r in rows] == [
        ("World Health Organization", "WHO", 1)
    ]


def test_mentions_count_corpus_wide(spark):
    chunks = _chunks(
        spark,
        [
            ("u1", "Global Data Org (GDO) and Global Data Org (GDO) twice."),
            ("u2", "Global Data Org (GDO) once more."),
        ],
    )
    rows = mine_acronym_aliases(chunks).collect()
    assert [(r.long_form, r.acronym, r.n_mentions) for r in rows] == [
        ("Global Data Org", "GDO", 3)
    ]
