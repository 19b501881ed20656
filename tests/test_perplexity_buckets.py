"""CCNet head/middle/tail bucketing (operators/mixing.py::perplexity_buckets):
exact tercile thresholds, per-language independence, tie semantics.  The
hash-value gate lives in __spark_entry__ (ccnet_perplexity_buckets composed
over the real unigram LM vs the DuckDB quantile_disc twin)."""

from __future__ import annotations

from aiwhispr_spark.operators.mixing import perplexity_buckets


def _buckets(spark, rows):
    df = spark.createDataFrame(rows, "doc_id bigint, lang string, mean_nll_i bigint")
    return {
        (r.doc_id, r.lang): (r.t_lo_i, r.t_hi_i, r.bucket)
        for r in perplexity_buckets(df).collect()
    }


def test_exact_terciles_split_head_middle_tail(spark):
    rows = [(i, "en", v) for i, v in enumerate([10, 20, 30, 40, 50, 60])]
    got = _buckets(spark, rows)
    # discrete terciles of 6 values: t_lo = 2nd (20), t_hi = 4th (40)
    assert all(v[:2] == (20, 40) for v in got.values())
    assert [got[(i, "en")][2] for i in range(6)] == [
        "head", "head", "middle", "middle", "tail", "tail",
    ]


def test_languages_bucket_independently(spark):
    rows = [(1, "en", 10), (2, "en", 20), (3, "en", 30),
            (4, "de", 1000), (5, "de", 2000), (6, "de", 3000)]
    got = _buckets(spark, rows)
    assert got[(3, "en")] == (10, 20, "tail")
    assert got[(4, "de")] == (1000, 2000, "head")


def test_ties_share_a_bucket_by_value(spark):
    # every doc has the same score: all land in head (nll <= t_lo), never
    # split by row order
    rows = [(i, "en", 7) for i in range(9)]
    got = _buckets(spark, rows)
    assert {v[2] for v in got.values()} == {"head"}
