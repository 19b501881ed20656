"""Greedy set-cover gates: marginal-gain semantics (round 2 counts only NEW
items — the winner can differ from the 2nd-biggest raw source), exhaustion
emits nothing (rounds stop when covered), deterministic tie-break."""

from __future__ import annotations

from aiwhispr_spark.operators.mixing import greedy_source_cover


def _run(spark, rows, k):
    df = spark.createDataFrame(rows, "src string, item string")
    return [
        (r["round"], r["source"], r["gain"], r["covered_total"])
        for r in greedy_source_cover(df, "src", "item", k=k)
        .orderBy("round")
        .collect()
    ]


def test_marginal_gain_beats_raw_size(spark):
    # a = {1,2,3,4}; b = {1,2,3}; c = {5,6}
    # raw sizes: a(4) > b(3) > c(2), but after a, b adds NOTHING and c adds 2
    rows = [("a", str(i)) for i in (1, 2, 3, 4)]
    rows += [("b", str(i)) for i in (1, 2, 3)]
    rows += [("c", str(i)) for i in (5, 6)]
    got = _run(spark, rows, k=3)
    assert got[0] == (1, "a", 4, 4)
    assert got[1] == (2, "c", 2, 6)
    # round 3: b's items are all covered, so b is GONE from the uncovered
    # incidence — zero-gain sources never win a round (cover is complete)
    assert len(got) == 2


def test_exhaustion_emits_no_rows(spark):
    rows = [("a", "1"), ("a", "2")]
    got = _run(spark, rows, k=3)
    # after round 1 the incidence is empty: rounds 2-3 vanish
    assert got == [(1, "a", 2, 2)]


def test_tie_breaks_by_source_asc(spark):
    rows = [("b", "1"), ("b", "2"), ("a", "3"), ("a", "4")]
    got = _run(spark, rows, k=2)
    assert got[0][1] == "a" and got[1][1] == "b"
