"""Extractive passage summary (operators/summarize.py)."""

from __future__ import annotations

from aiwhispr_spark.operators.summarize import extractive_summary, passage_chunks


def test_chunking_last_partial(spark):
    df = spark.createDataFrame([(1, " ".join(f"w{i}" for i in range(23)))],
                               "doc_id long, text string")
    got = {r.chunk_idx: r.words for r in passage_chunks(df, size=10).collect()}
    assert [len(got[i]) for i in (1, 2, 3)] == [10, 10, 3]
    assert got[3] == ["w20", "w21", "w22"]


def test_scoring_prefers_high_tf_passage(spark):
    # passage 2 repeats 'common' (high corpus-in-doc tf), passage 1 is all
    # hapaxes -> passage 2 must outrank it; tie-break tested via top=2 order
    text = (
        "alpha bravo charlie delta echo foxtrot golf hotel india juliet "
        + "common common common common common common common common common common"
    )
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    rows = sorted(extractive_summary(df, size=10, top=2).collect(),
                  key=lambda r: -r.score_i)
    assert rows[0].chunk_idx == 2 and rows[0].score_i == 100000  # tf=10 * 10/10 * 1e4
    assert rows[1].chunk_idx == 1 and rows[1].score_i == 10000   # tf=1 each


def test_stopword_only_passage_scores_zero(spark):
    df = spark.createDataFrame(
        [(1, "the and of to is in that it was for unusualword")],
        "doc_id long, text string",
    )
    rows = {r.chunk_idx: r.score_i for r in extractive_summary(df, size=10, top=2).collect()}
    assert rows[1] == 0 and rows[2] == 10000
