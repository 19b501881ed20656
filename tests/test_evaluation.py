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


def test_blocking_quality_metrics(spark):
    from aiwhispr_spark.operators.evaluation import blocking_quality

    items = spark.createDataFrame([(i,) for i in range(5)], "id long")  # 10 pairs
    cand = spark.createDataFrame([(0, 1), (0, 2), (3, 4), (0, 1)], "a long, b long")
    gold = spark.createDataFrame([(0, 1), (1, 2), (3, 4)], "a long, b long")
    r = blocking_quality(cand, gold, items).collect()[0]
    # cand dedups to 3; true = {(0,1),(3,4)} = 2
    assert (r.n_items, r.n_total_pairs, r.n_cand, r.n_gold, r.n_true) == (5, 10, 3, 3, 2)
    assert r.pc_i == (1_000_000 * 2) // 3
    assert r.pq_i == (1_000_000 * 2) // 3
    assert r.rr_i == (1_000_000 * 7) // 10


def test_blocking_quality_zero_support_sentinels(spark):
    from aiwhispr_spark.operators.evaluation import blocking_quality

    one = spark.createDataFrame([(0,)], "id long")
    empty = spark.createDataFrame([], "a long, b long")
    r = blocking_quality(empty, empty, one).collect()[0]
    assert (r.pc_i, r.pq_i, r.rr_i) == (-1, -1, -1)


def test_robust_outliers_mad_and_sentinel(spark):
    from aiwhispr_spark.operators.textstats import robust_outliers

    rows = (
        [("g1", i, 100) for i in range(4)]        # med 100
        + [("g1", 10, 104), ("g1", 11, 130)]      # adevs: 0,0,0,0,4,30
        + [("g2", 20, 50), ("g2", 21, 50), ("g2", 22, 60)]  # mad 0
    )
    df = spark.createDataFrame(rows, "src string, id long, v long")
    got = {
        (r.src, r.id): r
        for r in robust_outliers(df, "v", "src", "id", k_pm=3000).collect()
    }
    # g1: med=100, adevs sorted [0,0,0,0,4,30] -> mad = 0 (ceil(0.5*6)=3rd)
    # so ANY deviation flags with the -1 sentinel
    assert got[("g1", 10)].dev_pm == -1 and got[("g1", 11)].dev_pm == -1
    assert got[("g2", 22)].mad == 0 and got[("g2", 22)].dev_pm == -1
    assert ("g1", 0) not in got and ("g2", 20) not in got
