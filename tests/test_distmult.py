"""DistMult scoring semantics (kgscore.py::distmult_scores): symmetry (the
model's defining limitation) and divergence from TransE ordering."""

from __future__ import annotations


def test_distmult_is_symmetric_in_subj_obj(spark):
    from aiwhispr_spark.operators.kgscore import distmult_scores

    t = spark.createDataFrame(
        [("A", "rel1", "B"), ("B", "rel1", "A"), ("A", "rel2", "B")],
        "subj string, pred string, obj string",
    )
    rows = {(r.subj, r.pred, r.obj): r.score_i for r in distmult_scores(t).collect()}
    # DistMult cannot model asymmetric relations: swap scores identically
    assert rows[("A", "rel1", "B")] == rows[("B", "rel1", "A")]
    # but the relation vector matters
    assert rows[("A", "rel1", "B")] != rows[("A", "rel2", "B")]


def test_transe_is_not_symmetric(spark):
    from aiwhispr_spark.operators.kgscore import transe_scores

    t = spark.createDataFrame(
        [("A", "rel1", "B"), ("B", "rel1", "A")],
        "subj string, pred string, obj string",
    )
    rows = {(r.subj, r.obj): r.energy_i for r in transe_scores(t).collect()}
    assert rows[("A", "B")] != rows[("B", "A")]
