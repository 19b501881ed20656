"""Appositive is_a mining (operators/hearst.py::extract_appositive_isa):
head-noun election, closing-comma requirement, lowercase-phrase rule,
multiple appositives per chunk.  The hash-value gate lives in __spark_entry__
(appositive_isa vs a closed-form oracle)."""

from __future__ import annotations

from aiwhispr_spark.operators.hearst import extract_appositive_isa


def _rows(spark, texts):
    df = spark.createDataFrame(
        [(f"u{j}", t) for j, t in enumerate(texts)],
        "url string, text_chunk string",
    )
    return {
        (r.url, r.subj): (r.obj, r.phrase)
        for r in extract_appositive_isa(df).collect()
    }


def test_head_noun_election_and_multiple_matches(spark):
    got = _rows(
        spark,
        ["Acme Corp, a family-run software vendor, leads. Beta 7, an engine, ships."],
    )
    assert got == {
        ("u0", "Acme Corp"): ("vendor", "family-run software vendor"),
        ("u0", "Beta 7"): ("engine", "engine"),
    }


def test_decoys_emit_nothing(spark):
    got = _rows(
        spark,
        [
            "Gamma, a trailing case.",        # no closing comma
            "Delta, a Thing That caps, said.",  # capitalized word in phrase
            "plain, a vendor, text",           # subject is not a mention
        ],
    )
    assert got == {}
