"""Pronoun-coreference resolution (operators/coref.py) — contract pins on
hand-built chunks (the hash gate is kg_pronoun_coref)."""

from __future__ import annotations

from aiwhispr_spark.operators.coref import pronoun_resolved_triples


def _chunks(spark, rows):
    return spark.createDataFrame(rows, "url string, text_chunk string")


def test_resolves_to_nearest_preceding_anchor(spark):
    text = (
        "Acme Corp acquired Beta Ltd. "
        "It is based in Berlin. "
        "Zeta Inc acquired Theta. "
        "It is based in Paris."
    )
    got = {(r.sent_no, r.subj, r.pred, r.obj) for r in
           pronoun_resolved_triples(_chunks(spark, [("u", text)])).collect()}
    assert got == {
        (1, "Acme Corp", "based_in", "Berlin"),
        (3, "Zeta Inc", "based_in", "Paris"),
    }


def test_negated_assertions_drop(spark):
    text = (
        "Acme Corp acquired Beta. "
        "It was never based in Berlin. "
        "It is not based in Paris. "
        "They never acquired Gamma. "
        "It was founded by Ada."
    )
    got = [(r.subj, r.pred, r.obj) for r in
           pronoun_resolved_triples(_chunks(spark, [("u", text)])).collect()]
    assert got == [("Acme Corp", "founded_by", "Ada")]


def test_unresolvable_pronoun_and_pronoun_anchor_excluded(spark):
    # pronoun in the first sentence has no preceding anchor -> dropped;
    # "It" must never serve as an anchor for later sentences
    text = (
        "It is based in Berlin. "
        "It is based in Paris."
    )
    assert pronoun_resolved_triples(_chunks(spark, [("u", text)])).count() == 0


def test_resolution_is_chunk_scoped(spark):
    rows = [
        ("u1", "Acme Corp acquired Beta."),
        ("u2", "It is based in Berlin."),
    ]
    assert pronoun_resolved_triples(_chunks(spark, rows)).count() == 0
