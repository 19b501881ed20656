"""Unit gates for modeleval.py (calibration / click model / OLS) and
sharding.grouped_kfold — hand-computed expectations on tiny frames, the
properties the sf0.01 oracles can't isolate."""

import pytest
from pyspark.sql import functions as F

from aiwhispr_spark.operators.modeleval import (
    calibration_bins,
    ols_fit_by,
    pbm_attractiveness,
)
from aiwhispr_spark.operators.sharding import grouped_kfold


def test_calibration_perfect_and_ece(spark):
    # bin 0: two scores 1000 with pos_rate 0.1 -> mean 1000, rate 1000, gap 0
    # bin 9: two scores 9000, both positive -> rate 10000, gap 1000
    rows = [
        (1000, 0),
        (1000, 0),
        (1000, 1),
        (1000, 0),
        (1000, 0),
        (1000, 0),
        (1000, 0),
        (1000, 0),
        (1000, 0),
        (1000, 1),
        (9000, 1),
        (9000, 1),
    ]
    d = spark.createDataFrame(rows, "score_i long, label int")
    out = {r["bin"]: r for r in calibration_bins(d).collect()}
    b1 = out[1000 * 10 // 10000]
    assert (b1["mean_score_i"], b1["pos_rate_i"], b1["gap_i"]) == (1000, 2000, 1000)
    b9 = out[9]
    assert (b9["mean_score_i"], b9["pos_rate_i"], b9["gap_i"]) == (9000, 10000, 1000)
    ece = out[-1]
    # ECE = (10*1000 + 2*1000) // 12 = 1000
    assert ece["n"] == 12 and ece["gap_i"] == 1000
    assert ece["mean_score_i"] is None and ece["pos_rate_i"] is None


def test_calibration_top_bin_clamps(spark):
    d = spark.createDataFrame([(10000, 1)], "score_i long, label int")
    bins = {r["bin"] for r in calibration_bins(d).collect()}
    assert bins == {9, -1}  # score == scale lands in the last bin, not bin 10


def test_pbm_attractiveness_exact(spark):
    # item A: pos 1 clicked, pos 2 not -> exam_w = 60 + 30 = 90,
    # attract = 1 * 60 * 10000 // 90 = 6666
    rows = [
        (1, "a", 1, 1),
        (1, "a", 2, 0),
        (1, "b", 5, 1),  # exam_w 12, attract = 600000 // 12 = 50000 (cap-free MLE)
    ]
    d = spark.createDataFrame(rows, "query_id int, item_id string, pos int, clicked int")
    out = {r["item_id"]: r for r in pbm_attractiveness(d).collect()}
    assert out["a"]["exam_w"] == 90 and out["a"]["attract_i"] == 6666
    assert out["b"]["n_impr"] == 1 and out["b"]["attract_i"] == 50000


def test_ols_exact_line_and_degenerate(spark):
    # y = 3x + 7 exactly -> slope_i 30000, intercept_i 70000
    pts = [("g", x, 3 * x + 7) for x in range(6)]
    # degenerate: all x equal -> NULL fit, group still visible
    pts += [("flat", 2, 5), ("flat", 2, 9)]
    d = spark.createDataFrame(pts, "grp string, x long, y long")
    out = {r["grp"]: r for r in ols_fit_by(d, "grp").collect()}
    assert out["g"]["slope_i"] == 30000 and out["g"]["intercept_i"] == 70000
    assert out["flat"]["slope_i"] is None and out["flat"]["intercept_i"] is None
    assert out["flat"]["n"] == 2


def test_grouped_kfold_snake_and_grouping(spark):
    # 12 groups with sizes 12..1 -> ranks 1..12, k=3 snake:
    # ranks 1-3 folds 0,1,2; ranks 4-6 folds 2,1,0; ranks 7-9 folds 0,1,2...
    rows = []
    for g in range(12):
        rows += [(f"g{g:02d}",)] * (12 - g)
    d = spark.createDataFrame(rows, "grp string")
    out = grouped_kfold(d, "grp", k=3)
    got = {r["grp"]: r for r in out.collect()}
    assert got["g00"]["fold"] == 0 and got["g00"]["rank"] == 1
    assert got["g03"]["fold"] == 2 and got["g04"]["fold"] == 1
    assert got["g05"]["fold"] == 0
    # snake keeps fold doc-totals within one group-size of each other
    totals = {}
    for r in got.values():
        totals[r["fold"]] = totals.get(r["fold"], 0) + r["n_docs"]
    assert max(totals.values()) - min(totals.values()) <= 12
    # one row per group == every group lands in exactly one fold
    assert out.count() == 12


def test_grouped_kfold_rejects_k1(spark):
    d = spark.createDataFrame([("a",)], "grp string")
    with pytest.raises(ValueError):
        grouped_kfold(d, "grp", k=1)
