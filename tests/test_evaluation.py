"""Extraction P/R/F1 (operators/evaluation.py::extraction_prf): hand-computed
counts, one-sided predicates (NULL for the undefined ratio), duplicate-row
idempotence.  The hash-value gate lives in __spark_entry__
(kg_extraction_eval: real E3 output vs planted-deviation gold)."""

from __future__ import annotations

from aiwhispr_spark.operators.evaluation import extraction_prf


def _prf(spark, pred_rows, gold_rows):
    schema = "subj string, pred string, obj string"
    p = spark.createDataFrame(pred_rows, schema)
    g = spark.createDataFrame(gold_rows, schema)
    return {r.pred: r.asDict() for r in extraction_prf(p, g).collect()}


def test_hand_computed_metrics_and_one_sided_predicates(spark):
    got = _prf(
        spark,
        [("A", "p", "X"), ("A", "p", "Y"), ("B", "q", "Z")],
        [("A", "p", "X"), ("A", "p", "W"), ("C", "r", "V")],
    )
    assert got["p"] == {
        "pred": "p", "n_pred": 2, "n_gold": 2, "tp": 1,
        "precision_i": 500000, "recall_i": 500000, "f1_i": 500000,
    }
    # predicted-only: recall undefined (no gold), precision 0
    assert (got["q"]["precision_i"], got["q"]["recall_i"]) == (0, None)
    # gold-only: precision undefined (nothing predicted), recall 0
    assert (got["r"]["precision_i"], got["r"]["recall_i"]) == (None, 0)
    assert got["r"]["f1_i"] == 0


def test_duplicate_rows_count_once(spark):
    got = _prf(
        spark,
        [("A", "p", "X")] * 5,
        [("A", "p", "X")] * 3,
    )
    assert got["p"]["n_pred"] == 1 and got["p"]["n_gold"] == 1
    assert got["p"]["precision_i"] == 1000000
    assert got["p"]["f1_i"] == 1000000
