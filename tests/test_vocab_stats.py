"""Zipf/Heaps corpus diagnostics (operators/textstats.py::vocab_stats):
hand-computed counts, per-language independence, hapax/top-10 shares.  The
hash-value gate lives in __spark_entry__ (corpus_vocab_stats)."""

from __future__ import annotations

from aiwhispr_spark.operators.textstats import vocab_stats


def test_hand_computed_vocab_panel(spark):
    rows = [
        ("en", "the the the cat sat"),
        ("en", "the dog"),
        ("de", "der der hund"),
    ]
    df = spark.createDataFrame(rows, "lang string, text string")
    got = {r.lang: (r.n_tokens, r.vocab_size, r.hapax_n,
                    r.hapax_share_pm, r.top10_share_pm)
           for r in vocab_stats(df).collect()}
    # en: tokens the*4 cat sat dog = 7; vocab 4; hapax cat/sat/dog = 3
    assert got["en"] == (7, 4, 3, 428, 1000)
    # de: der*2 hund = 3 tokens, vocab 2, hapax 1
    assert got["de"] == (3, 2, 1, 333, 1000)
