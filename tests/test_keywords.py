"""TextRank keywords + PMI collocations (operators/keywords.py)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from aiwhispr_spark.operators.keywords import (
    cooccurrence_edges,
    kept_tokens_expr,
    pmi_collocations,
    textrank_keywords,
)


def test_kept_tokens_filter(spark):
    df = spark.createDataFrame(
        [("The quick-fox AND the lazy dog ran 42 times ok",)], "text string"
    )
    (row,) = df.select(kept_tokens_expr(F.col("text")).alias("t")).collect()
    # 'the'/'and' stopwords, 'quick-fox' not pure [a-z], '42' digits, 'ok' short
    assert row.t == ["lazy", "dog", "ran", "times"]


def test_cooccurrence_edges_undirected_distinct(spark):
    df = spark.createDataFrame([("alpha beta alpha beta",)], "text string")
    got = {(r.src, r.dst) for r in cooccurrence_edges(df).collect()}
    assert got == {("alpha", "beta"), ("beta", "alpha")}


def test_textrank_hub_word_wins(spark):
    # star graph: 'hub' co-occurs with every spoke -> highest PageRank
    docs = [(f"hub spoke{c}",) for c in "abcdef"]
    df = spark.createDataFrame(docs, "text string")
    top = textrank_keywords(df, k=3, iterations=5).collect()
    assert top[0].word == "hub"


def test_pmi_exact_value(spark):
    # one doc: "cat dog cat dog ... " -> kept stream of 2 tokens alternating
    df = spark.createDataFrame([("cat dog " * 6,)], "text string")
    rows = pmi_collocations(df, min_count=5, k=10).collect()
    got = {r.bigram: (r.pair_l, r.pmi_i) for r in rows}
    # stream: 12 tokens (6 cat, 6 dog); 11 bigrams: 6x 'cat dog', 5x 'dog cat'
    n, b = 12, 11
    exp_cd = round(10000 * math.log((6 * n * n) / (b * 6 * 6)))
    assert got["cat dog"] == (6, exp_cd)
    assert got["dog cat"] == (5, round(10000 * math.log((5 * n * n) / (b * 6 * 6))))
