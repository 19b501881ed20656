"""PQ (product quantization) gates: exact self-assignment, tie-breaks,
ADC-vs-exact agreement when the corpus IS the codebook, and validation."""

import pytest
from pyspark.sql import functions as F

from aiwhispr_spark.operators.similarity import (
    fixed_point_vectors,
    pq_adc_topk,
    pq_assign,
)


def _vecs(spark, rows, dim):
    return spark.createDataFrame(rows, f"vec_id long, fp array<long>")


def test_pq_codebook_vectors_assign_to_themselves(spark):
    # 4-d, m=2: each codebook vector's nearest sub-centroid is itself, dist 0
    cb_rows = [(0, [0, 0, 0, 0]), (1, [10, 10, 10, 10]), (2, [20, 20, 20, 20])]
    vecs = _vecs(spark, cb_rows, 4)
    cb = vecs.select(F.col("vec_id").alias("code"), F.col("fp").alias("cfp"))
    out = pq_assign(vecs, cb, m=2, dim=4).collect()
    assert len(out) == 6  # 3 vectors x 2 subspaces
    for r in out:
        assert r["code"] == r["vec_id"] and r["dist"] == 0


def test_pq_assignment_mixes_subspaces_and_tie_breaks(spark):
    cb_rows = [(0, [0, 0, 100, 100]), (1, [100, 100, 0, 0])]
    cb = _vecs(spark, cb_rows, 4).select(
        F.col("vec_id").alias("code"), F.col("fp").alias("cfp")
    )
    # near code 1 in subspace 0, near code 0 in subspace 1
    v = _vecs(spark, [(7, [90, 90, 90, 90])], 4)
    got = {r["s"]: r for r in pq_assign(v, cb, m=2, dim=4).collect()}
    assert got[0]["code"] == 1 and got[1]["code"] == 0
    # exact tie: equidistant -> smallest code wins
    t = _vecs(spark, [(8, [50, 50, 50, 50])], 4)
    tie = {r["s"]: r["code"] for r in pq_assign(t, cb, m=2, dim=4).collect()}
    assert tie == {0: 0, 1: 0}


def test_pq_adc_equals_exact_when_corpus_is_codebook(spark):
    # when every corpus vector IS a codebook entry, ADC distance == exact
    # squared L2 to the query (assignment is lossless)
    rows = [(i, [i * 3, i * 5, 100 - i, i * i]) for i in range(6)]
    vecs = _vecs(spark, rows, 4)
    cb = vecs.select(F.col("vec_id").alias("code"), F.col("fp").alias("cfp"))
    qrow = [(99, [7, 11, 95, 4])]
    q = _vecs(spark, qrow, 4)
    out = pq_adc_topk(vecs, cb, q, k=6, m=2, dim=4).collect()
    qv = qrow[0][1]
    exact = sorted(
        (sum((a - b) ** 2 for a, b in zip(v, qv)), i) for i, v in rows
    )
    got = [(r["adc_i"], r["vec_id"]) for r in sorted(out, key=lambda r: r["rank"])]
    assert got == exact


def test_pq_rejects_indivisible_dim(spark):
    v = _vecs(spark, [(0, [1, 2, 3])], 3)
    cb = v.select(F.col("vec_id").alias("code"), F.col("fp").alias("cfp"))
    with pytest.raises(ValueError):
        pq_assign(v, cb, m=2, dim=3)


def test_fixed_point_rounding(spark):
    d = spark.createDataFrame(
        [(1, [0.0015, -0.0015, 1.5])], "vec_id long, embedding array<double>"
    )
    fp = fixed_point_vectors(d).collect()[0]["fp"]
    # round-half-away-from-zero at the scale boundary, exact on .5
    assert fp == [2, -2, 1500]
