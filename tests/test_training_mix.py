"""Composed training-mix plan (plans/training.py): stage interactions the
per-stage gates can't see — benchmark leakage drops survivors, dedup keeps
the min id, packing rolls over at capacity, and the whole mix is
deterministic.  The end-to-end value gate lives in __spark_entry__
(training_mix_pipeline vs a five-stage composed DuckDB oracle)."""

from __future__ import annotations

from pyspark.sql import functions as F

from aiwhispr_spark.plans.training import build_training_mix

# clears lang=en and quality_i >= 3000 under textstats' heuristics
# (enough distinct en stopwords, low punctuation)
GOOD = "the quick brown fox and the lazy dog are of a kind to be seen in it"
# same 4-token prefix as GOOD then diverges: shares NO 5-token window
LEAKED = "the quick brown fox jumped over seventeen bright candles and it was seen by a dog"
# GOOD reversed: same stopword mass, zero shared 5-gram windows with LEAKED
ALSO_GOOD = " ".join(reversed(GOOD.split()))


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string, source string")


def test_stage_interactions(spark):
    docs = _docs(
        spark,
        [
            (1, GOOD, "web"),
            (2, GOOD, "web"),           # exact dup of 1 -> loses election
            (3, LEAKED, "web"),         # verbatim in the benchmark -> drops
            (4, "zzz qqq xxx", "web"),  # fails quality/lang floor
            (5, ALSO_GOOD, "books"),
        ],
    )
    bench = _docs(spark, [(99, LEAKED, "bench")])
    out = build_training_mix(
        docs, bench, decontam_n=5, base_frac=1.0, capacity=256
    ).collect()
    ids = {r.doc_id for r in out}
    # 2 lost dedup, 3 is contaminated, 4 failed the floor; base_frac=1.0
    # keeps every sampled source fully
    assert ids == {1, 5}
    by_id = {r.doc_id: r for r in out}
    assert by_id[1].source == "web" and by_id[5].source == "books"
    assert all(r.seq_id == 0 and r.seq_offset == 0 for r in out)
    assert all(r.quality_i >= 3000 and r.rate_i == 1000000 for r in out)


def test_packing_rolls_over_at_capacity(spark):
    # 4 distinct docs of 18 tokens each in one shard, capacity 36 ->
    # exactly two per sequence
    docs = _docs(spark, [(i, GOOD + f" w{i}", "web") for i in range(1, 5)])
    bench = _docs(spark, [(99, "completely unrelated benchmark line", "b")])
    out = {
        r.doc_id: (r.seq_id, r.seq_offset, r.n_tokens)
        for r in build_training_mix(
            docs, bench, decontam_n=30, base_frac=1.0, capacity=36
        ).collect()
    }
    assert out[1] == (0, 0, 18) and out[2] == (0, 18, 18)
    assert out[3] == (1, 0, 18) and out[4] == (1, 18, 18)


def test_mix_is_deterministic(spark):
    words = GOOD.split()
    # a doc-unique token mid-sentence caps shared runs at 9 < 13, so only
    # the docs literally IN the benchmark flag contaminated
    docs = _docs(
        spark,
        [
            (i, " ".join(words[:8] + [f"w{i}"] + words[8:]), ["web", "books"][i % 2])
            for i in range(40)
        ],
    )
    bench = docs.filter(F.col("doc_id") % 10 == 0)
    a = sorted(map(tuple, build_training_mix(docs, bench).collect()))
    b = sorted(map(tuple, build_training_mix(docs, bench).collect()))
    assert a == b and len(a) > 0
