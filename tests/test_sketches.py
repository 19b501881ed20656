"""Count-min sketch (operators/sketches.py): one-sided error guarantee
(est >= true for EVERY token, any width), exactness when collision-free,
and forced-collision overcount behavior at tiny width."""

from __future__ import annotations

from pyspark.sql import functions as F

from aiwhispr_spark.operators.sketches import (
    cms_counters,
    cms_estimate,
    cms_heavy_hitters,
)


def _tokens(spark):
    words = ["alpha"] * 50 + ["beta"] * 20 + ["gamma"] * 5 + ["delta", "epsilon"]
    return spark.createDataFrame([(w,) for w in words], "tok string")


def test_one_sided_error_any_width(spark):
    toks = _tokens(spark)
    for width in (2, 16, 256):
        counters = cms_counters(toks, depth=4, width=width)
        true_cnt = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("true_cnt"))
        est = cms_estimate(counters, true_cnt, depth=4, width=width)
        rows = est.join(true_cnt, "tok").collect()
        assert len(rows) == 5
        for r in rows:
            assert r.est >= r.true_cnt, f"{r.tok} under-counted at width {width}"


def test_exact_when_wide(spark):
    # 5 distinct tokens into 4x256 buckets: collisions astronomically
    # unlikely with this fixed hash family — assert exactness outright
    out = {r.tok: r for r in cms_heavy_hitters(_tokens(spark), k=10).collect()}
    assert out["alpha"].est_l == out["alpha"].true_l == 50
    assert all(r.over_l == 0 for r in out.values())


def test_forced_collisions_overcount(spark):
    # width=2: 5 tokens share 2 buckets per row -> some token MUST overcount
    toks = _tokens(spark)
    counters = cms_counters(toks, depth=2, width=2)
    true_cnt = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("true_cnt"))
    est = cms_estimate(counters, true_cnt, depth=2, width=2)
    rows = est.join(true_cnt, "tok").collect()
    assert any(r.est > r.true_cnt for r in rows)
    # total sketch mass per row equals the stream length
    mass = (
        cms_counters(toks, depth=2, width=2)
        .groupBy("r")
        .agg(F.sum("c").alias("m"))
        .collect()
    )
    assert all(m.m == 77 for m in mass)


def test_topk_deterministic_tiebreak(spark):
    out = cms_heavy_hitters(_tokens(spark), k=3).collect()
    assert [r.tok for r in out] == ["alpha", "beta", "gamma"]


def test_heavy_hitters_single_corpus_aggregate(spark):
    # the sketch build and the true counts must share ONE token aggregation
    # (ReusedExchange in the plan), not scan/shuffle the stream twice
    from aiwhispr_spark.operators.sketches import cms_heavy_hitters

    toks = spark.createDataFrame(
        [(t,) for t in ["a", "b", "a", "c", "a", "b"]], "tok string"
    )
    out = cms_heavy_hitters(toks, k=3)
    got = {(r.tok, r.true_l) for r in out.collect()}
    assert got == {("a", 3), ("b", 2), ("c", 1)}
    # AQE finalizes reuse only after execution — inspect the plan post-collect
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "ReusedExchange" in plan
