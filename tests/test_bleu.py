"""BLEU modified n-gram precision semantics (evaluation.py::
bleu_ngram_stats): clipping against reference counts, per-n denominators,
empty/short sides."""

from __future__ import annotations


def test_bleu_clipping_hand_computed(spark):
    from aiwhispr_spark.operators.evaluation import bleu_ngram_stats

    # Papineni's classic degenerate candidate: "the the the the the the the"
    # vs a reference with two 'the' → p1 clips to 2/7
    pairs = spark.createDataFrame(
        [
            (0, "the the the the the the the", "the cat is on the mat"),
            (1, "the cat sat", "the cat sat"),
        ],
        "pair_id long, cand_text string, ref_text string",
    )
    rows = {
        (r.pair_id, r.n): r
        for r in bleu_ngram_stats(pairs).collect()
    }
    r = rows[(0, 1)]
    assert (r.clipped_num, r.cand_den) == (2, 7)
    assert r.prec_i == 2 * 10000 // 7
    # no bigram "the the" in the reference → p2 = 0/6
    assert (rows[(0, 2)].clipped_num, rows[(0, 2)].cand_den) == (0, 6)
    # identical pair → perfect precision at every n
    for n in range(1, 5):
        rr = rows[(1, n)]
        if rr.cand_den > 0:
            assert rr.clipped_num == rr.cand_den and rr.prec_i == 10000
    # candidate shorter than n → den 0 and the -1 sentinel
    assert rows[(1, 4)].cand_den == 0 and rows[(1, 4)].prec_i == -1
    assert rows[(0, 1)].len_cand == 7 and rows[(0, 1)].len_ref == 6


def test_bleu_empty_candidate(spark):
    from aiwhispr_spark.operators.evaluation import bleu_ngram_stats

    pairs = spark.createDataFrame(
        [(0, "", "some reference text")],
        "pair_id long, cand_text string, ref_text string",
    )
    rows = bleu_ngram_stats(pairs).collect()
    assert len(rows) == 4
    for r in rows:
        assert (r.clipped_num, r.cand_den, r.prec_i) == (0, 0, -1)
        assert r.len_cand == 0 and r.len_ref == 3
