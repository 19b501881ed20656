"""UniMax epoch water-fill (mixing.py::epoch_allocation) + RRF fusion
(fulltext.py::rrf_fuse) — budget conservation, cap respect, equal shares."""

def _alloc(spark, rows, budget, epochs):
    from aiwhispr_spark.operators.mixing import epoch_allocation

    src = spark.createDataFrame(rows, "source string, n_tokens long")
    return {r.source: r for r in epoch_allocation(src, budget, epochs).collect()}


def test_waterfill_caps_small_and_splits_rest(spark):
    # caps at 3 epochs: a=300, b=3000, c=30000; budget 10000:
    # a capped (300*3=900 <= 10000/3 each); remaining 9100 splits over b,c
    # -> 4550 each; b's cap is 9000 > 4550 so b uncapped
    got = _alloc(spark, [("a", 300), ("b", 3000), ("c", 10000)], 10000, 3)
    assert (got["a"].alloc_tokens, got["a"].capped) == (900, 1)
    assert (got["b"].alloc_tokens, got["b"].capped) == (4550, 0)
    assert (got["c"].alloc_tokens, got["c"].capped) == (4550, 0)
    assert got["a"].epochs_mi == 30000  # exactly 3 epochs
    assert got["b"].epochs_mi == 4550 * 10000 // 3000
    # conservation: sum(alloc) == budget (floor share left nothing here)
    assert sum(r.alloc_tokens for r in got.values()) == 10000


def test_waterfill_budget_exceeds_all_caps(spark):
    got = _alloc(spark, [("a", 100), ("b", 200)], 1_000_000, 2)
    assert got["a"].alloc_tokens == 200 and got["b"].alloc_tokens == 400
    assert all(r.capped == 1 for r in got.values())  # budget not exhausted


def test_waterfill_floor_share_remainder_unallocated(spark):
    # 2 uncapped sources, budget 101 -> 50 each, 1 token unallocated
    got = _alloc(spark, [("a", 1000), ("b", 1000)], 101, 3)
    assert got["a"].alloc_tokens == 50 and got["b"].alloc_tokens == 50


def test_rrf_prefers_docs_ranked_in_both_arms(spark):
    from aiwhispr_spark.operators.fulltext import rrf_fuse

    arm1 = spark.createDataFrame([(10, 1), (20, 2), (30, 3)], "id long, rank int")
    arm2 = spark.createDataFrame([(20, 1), (40, 2)], "id long, rank int")
    out = [(r.id, r.rrf_mi, r.n_arms) for r in rrf_fuse([arm1, arm2], k=10).collect()]
    rr = lambda r: 1_000_000 // (60 + r)
    # doc 20 (ranks 2+1) beats doc 10 (rank 1 in one arm only)
    assert out[0] == (20, rr(2) + rr(1), 2)
    assert out[1] == (10, rr(1), 1)
    assert [x[0] for x in out] == [20, 10, 40, 30]


def test_waterfill_keeps_ineligible_sources_visible(spark):
    got = _alloc(spark, [("a", 1000), ("zero", 0), ("nul", None)], 900, 3)
    assert set(got) == {"a", "zero", "nul"}  # registry rows never vanish
    assert (got["zero"].alloc_tokens, got["zero"].epochs_mi) == (0, 0)
    assert (got["nul"].n_tokens, got["nul"].alloc_tokens) == (0, 0)
    assert got["a"].alloc_tokens == 900  # budget split over ELIGIBLE only


def test_rrf_dedups_ids_within_a_run(spark):
    from aiwhispr_spark.operators.fulltext import rrf_fuse

    arm = spark.createDataFrame([(7, 3), (7, 9), (8, 1)], "id long, rank int")
    out = {r.id: (r.rrf_mi, r.n_arms) for r in rrf_fuse([arm], k=10).collect()}
    rr = lambda r: 1_000_000 // (60 + r)
    assert out[7] == (rr(3), 1)  # min rank once, never double-counted
    assert out[8] == (rr(1), 1)
