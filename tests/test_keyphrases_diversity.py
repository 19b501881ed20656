"""RAKE keyphrase + lexical-diversity gates:

* RAKE segmentation — the in-row fold must split on stopwords AND
  non-[a-z]+ tokens, flush the tail run, and drop delimiter-only docs;
* RAKE scoring — deg/freq word scores and phrase sums hand-checked on the
  paper-style fixture (single-word vs multi-word phrase dominance);
* Yule's K — closed-form checks: an all-distinct doc has K=0, a
  one-token-repeated doc has K = 10^4·(N²−N)/N² ≈ 10^4.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from aiwhispr_spark.operators.keywords import _rake_phrases, rake_keyphrases
from aiwhispr_spark.operators.textstats import lexical_diversity_panel


def test_rake_segmentation_fold(spark):
    df = spark.createDataFrame(
        [
            ("deep learning is neural search for vector index",),
            ("the and of to",),  # stopwords only -> no phrases
            ("tail run here",),  # no trailing delimiter: finish must flush
            ("Mixed42 case! splits here",),  # non-[a-z]+ tokens delimit
        ],
        "text string",
    )
    rows = df.select(_rake_phrases(F.col("text")).alias("ph")).collect()
    assert rows[0]["ph"] == [["deep", "learning"], ["neural", "search"], ["vector", "index"]]
    assert rows[1]["ph"] == []
    assert rows[2]["ph"] == [["tail", "run", "here"]]
    assert rows[3]["ph"] == [["splits", "here"]]


def test_rake_scores_hand_checked(spark):
    # phrases: [deep learning], [deep search], [search]
    # freq: deep=2, learning=1, search=2 ; deg: deep=4, learning=2, search=3
    # wscore_i (x1e4): deep=20000, learning=20000, search=15000
    # phrase scores: "deep learning"=40000, "deep search"=35000, "search"=15000
    df = spark.createDataFrame(
        [("deep learning is deep search",), ("the search",)], "text string"
    )
    got = {
        r["phrase"]: (r["n_words"], r["n_occurrences"], r["score_i"])
        for r in rake_keyphrases(df).collect()
    }
    assert got == {
        "deep learning": (2, 1, 40000),
        "deep search": (2, 1, 35000),
        "search": (1, 1, 15000),
    }


def test_yule_k_closed_forms(spark):
    df = spark.createDataFrame(
        [
            ("a", "one two three four five"),  # all distinct: s2=N, K=0
            ("b", "x x x x"),  # one type: s2=16, N=4, K_i=(1e6*12)//16=750000
        ],
        "source string, text string",
    )
    got = {r["grp"]: r for r in lexical_diversity_panel(df).collect()}
    assert got["a"]["yule_k_i"] == 0
    assert got["a"]["ttr_i"] == 1_000_000
    assert got["a"]["n_hapax"] == 5
    assert got["b"]["yule_k_i"] == 750_000
    assert got["b"]["n_types"] == 1
    assert got["b"]["hapax_i"] == 0
