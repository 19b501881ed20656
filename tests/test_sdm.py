"""SDM proximity-ranking semantics (fulltext.py::sdm_score): ordered #1
adjacency, unordered #uw8 windows, integer weighting, tie-break."""

from __future__ import annotations


def test_sdm_hand_computed_counts(spark):
    from aiwhispr_spark.operators.fulltext import sdm_score

    docs = spark.createDataFrame(
        [
            # "table scan": 1 ordered hit; positions table@0, scan@1 →
            # 1 unordered (|1-0|<=7); "scan fast" adjacent too
            (0, "table scan fast"),
            # ordered bigram absent (reversed); unordered still counts
            (1, "scan table x x fast"),
            # table@0, scan@9: gap 9 > 7 → no unordered hit, no ordered
            (2, "table a b c d e f g h scan"),
            # no query terms at all
            (3, "nothing here"),
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in sdm_score(docs, ["table", "scan", "fast"]).collect()}
    r0 = out[0]
    assert r0.tf_total == 3
    assert r0.ordered_hits == 2          # table→scan and scan→fast
    assert r0.unordered_hits == 2        # both pairs within window
    assert r0.sdm_score == 85 * 3 + 10 * 2 + 5 * 2
    r1 = out[1]
    assert r1.tf_total == 3
    assert r1.ordered_hits == 0          # 'scan table' is the wrong order
    # pairs: (table@1, scan@0): |0-1|=1 ok; (scan@0, fast@4): 4 ok
    assert r1.unordered_hits == 2
    r2 = out[2]
    assert r2.tf_total == 2
    assert (r2.ordered_hits, r2.unordered_hits) == (0, 0)  # gap 9 > 7
    r3 = out[3]
    assert (r3.tf_total, r3.sdm_score) == (0, 0)


def test_sdm_repeated_terms_count_all_pairs(spark):
    from aiwhispr_spark.operators.fulltext import sdm_score

    docs = spark.createDataFrame(
        [(0, "table table scan")], "doc_id long, text string"
    )
    r = sdm_score(docs, ["table", "scan"]).collect()[0]
    assert r.tf_total == 3
    assert r.ordered_hits == 1           # only table@1 → scan@2
    assert r.unordered_hits == 2         # (table@0,scan@2) and (table@1,scan@2)
