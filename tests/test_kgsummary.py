"""Entity summarization surfaces (operators/kgsummary.py) — unit pins with
hand-computed IDF/PMI (the hash gates live in __spark_entry__:
kg_fact_rank / kg_related_entities vs composed DuckDB oracles)."""

from __future__ import annotations

import math

from aiwhispr_spark.operators.kgsummary import (
    entity_comention_pmi,
    fact_informativeness,
)


def test_fact_informativeness_common_fact_ranks_last(spark):
    # 3 subjects; (based_in, Berlin) shared by all (idf 0), unique facts win
    t = spark.createDataFrame(
        [
            ("A", "based_in", "Berlin"),
            ("B", "based_in", "Berlin"),
            ("C", "based_in", "Berlin"),
            ("A", "acquired", "X"),
            ("A", "based_in", "Berlin"),  # duplicate triple must not inflate df
        ],
        "subj string, pred string, obj string",
    )
    rows = {(r.subj, r.fact_rank): (r.pred, r.obj, r.idf_i) for r in
            fact_informativeness(t, top_k=3).collect()}
    assert rows[("A", 1)] == ("acquired", "X", round(1e6 * math.log(3)))
    assert rows[("A", 2)] == ("based_in", "Berlin", 0)
    assert rows[("B", 1)] == ("based_in", "Berlin", 0)
    assert len(rows) == 4  # A has 2 facts, B and C one each


def test_fact_informativeness_top_k_cuts(spark):
    t = spark.createDataFrame(
        [("A", "p", f"o{i}") for i in range(5)] + [("B", "p", "o0")],
        "subj string, pred string, obj string",
    )
    out = fact_informativeness(t, top_k=2)
    assert out.filter("subj = 'A'").count() == 2


def test_entity_comention_pmi_hand_computed(spark):
    # pages: u1 {A,B}, u2 {A,B}, u3 {A,C} -> pair (A,B) on 2 pages
    t = spark.createDataFrame(
        [
            ("u1", "A", "p", "B"),
            ("u2", "A", "p", "B"),
            ("u3", "A", "p", "C"),
        ],
        "url string, subj string, pred string, obj string",
    )
    [row] = entity_comention_pmi(t, min_pages=2).collect()
    # c(A)=3, c(B)=2, N=3, c(A,B)=2
    assert (row.a, row.b, row.n_pages_pair) == ("A", "B", 2)
    assert row.pmi_i == round(1e6 * math.log(2 * 3 / (3 * 2)))


def test_entity_comention_min_pages_filters(spark):
    t = spark.createDataFrame(
        [("u1", "A", "p", "B")], "url string, subj string, pred string, obj string"
    )
    assert entity_comention_pmi(t, min_pages=2).count() == 0
