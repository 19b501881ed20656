"""KMV pairwise Jaccard/intersection estimator (sketches.py::
kmv_pair_jaccard): small-regime exactness and estimator sanity."""

from __future__ import annotations


def _docs(spark, rows):
    return spark.createDataFrame(rows, "source string, text string")


def test_kmv_pair_small_regime_is_exact(spark):
    from aiwhispr_spark.operators.sketches import kmv_pair_jaccard

    # each side has 4 distinct 3-shingles, 2 shared → union 6 < k=16:
    # K is the FULL union, so Jaccard and intersection are exact
    a = "p q r s t u"          # shingles: pqr qrs rst stu
    b = "x y p q r s z w"      # shingles: xyp ypq pqr qrs rsz szw
    out = kmv_pair_jaccard(
        _docs(spark, [("A", a), ("B", b)]), k=16
    ).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.grp_a, r.grp_b) == ("A", "B")
    assert r.k_eff == 8          # |union of shingle sets| = 4 + 6 - 2
    assert r.n_shared == 2
    assert r.jaccard_i == 2 * 10000 // 8
    assert r.est_union == 8 and r.est_inter == 2


def test_kmv_pair_identical_groups_jaccard_one(spark):
    from aiwhispr_spark.operators.sketches import kmv_pair_jaccard

    text = " ".join(f"w{i}" for i in range(200))
    out = kmv_pair_jaccard(
        _docs(spark, [("A", text), ("B", text)]), k=16
    ).collect()
    r = out[0]
    # identical sets → every sketch member shared, estimator regime live
    assert r.k_eff == 16 and r.n_shared == 16 and r.jaccard_i == 10000
    # union estimate within a factor ~2 of the true 198 shingles (k=16)
    assert 60 <= r.est_union <= 600
    assert r.est_inter == r.est_union


def test_kmv_pair_disjoint_groups(spark):
    from aiwhispr_spark.operators.sketches import kmv_pair_jaccard

    t1 = " ".join(f"a{i}" for i in range(100))
    t2 = " ".join(f"b{i}" for i in range(100))
    r = kmv_pair_jaccard(_docs(spark, [("A", t1), ("B", t2)]), k=16).collect()[0]
    assert r.n_shared == 0 and r.jaccard_i == 0 and r.est_inter == 0
