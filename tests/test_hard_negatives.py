"""Hard-negative mining gates: gold exclusion is PER QUERY (a q1-gold doc
can still be a q2 negative), ranks are dense 1..n per query, and the BM25
ordering actually drives selection (the top non-gold scorer is rank 1)."""

from __future__ import annotations

from pyspark.sql import functions as F

from aiwhispr_spark.operators.fulltext import build_inverted_index, mine_hard_negatives


def test_hard_negatives_exclude_gold_per_query(spark):
    docs = spark.createDataFrame(
        [
            (1, "apple apple apple"),
            (2, "apple apple banana"),
            (3, "apple banana banana"),
            (4, "banana banana banana"),
            (5, "cherry plum"),
        ],
        "doc_id long, text string",
    )
    idx = build_inverted_index(docs, "text", "doc_id")
    dl = docs.select(
        F.col("doc_id").alias("id"),
        F.size(F.split(F.col("text"), " ")).cast("double").alias("dl"),
    )
    pos = spark.createDataFrame([("qa", 1), ("qb", 4)], "qid string, id long")
    out = mine_hard_negatives(
        idx, dl, {"qa": ["apple"], "qb": ["banana"]}, pos, n_neg=2
    ).collect()
    by_q = {}
    for r in out:
        by_q.setdefault(r["qid"], []).append(r)
    # gold excluded per query: doc 1 not in qa, doc 4 not in qb
    assert all(r["neg_id"] != 1 for r in by_q["qa"])
    assert all(r["neg_id"] != 4 for r in by_q["qb"])
    # doc 4 (apple-less) can't be an apple negative; doc 1 IS a valid qb
    # candidate only if it contains banana — it doesn't, so qb negatives
    # come from {2, 3}
    assert {r["neg_id"] for r in by_q["qb"]} == {2, 3}
    # rank 1 = highest tf of the query term among non-gold: doc 2 for qa
    ranked_a = sorted(by_q["qa"], key=lambda r: r["neg_rank"])
    assert ranked_a[0]["neg_id"] == 2
    # ranks dense 1..n
    assert [r["neg_rank"] for r in ranked_a] == [1, 2]
