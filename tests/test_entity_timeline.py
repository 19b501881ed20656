"""Entity biography assembly (operators/temporal.py::entity_timeline):
chronological rendering with full tie-break, distinct-fact dedup, year
bounds.  The hash-value gate lives in __spark_entry__ (kg_entity_timeline
composed over the real dated-fact extractor)."""

from __future__ import annotations

from aiwhispr_spark.operators.temporal import entity_timeline


def _tl(spark, rows):
    df = spark.createDataFrame(
        rows, "subj string, pred string, obj string, qualifier string, year int"
    )
    return {r.subj: r.asDict() for r in entity_timeline(df).collect()}


def test_chronological_order_with_tie_break_and_dedup(spark):
    rows = [
        ("E1", "based_in", "Berlin", "since", 2003),
        ("E1", "acquired", "B Corp", "in", 1994),
        ("E1", "acquired", "A Corp", "in", 1994),  # same year: pred/obj tie-break
        ("E1", "acquired", "A Corp", "in", 1994),  # duplicate fact: once
    ]
    got = _tl(spark, rows)["E1"]
    assert got["n_events"] == 3
    assert (got["first_year"], got["last_year"]) == (1994, 2003)
    assert got["timeline"] == (
        "1994 in acquired A Corp | 1994 in acquired B Corp | "
        "2003 since based_in Berlin"
    )


def test_single_fact_entity(spark):
    got = _tl(spark, [("E2", "acquired", "X", "in", 2001)])["E2"]
    assert got["timeline"] == "2001 in acquired X"
    assert got["n_events"] == 1
