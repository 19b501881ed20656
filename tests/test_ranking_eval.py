"""IR ranking-quality panel (evaluation.py::ranking_metrics) — hand-computed
NDCG/MRR/recall pins; the 1/log2(r+1) discount is an integer literal table so
every runtime step is exact BIGINT."""

W = [10000, 6309, 5000, 4307, 3869, 3562, 3333, 3155, 3010, 2891]


def _metrics(spark, res_rows, qrel_rows, k=10):
    from aiwhispr_spark.operators.evaluation import ranking_metrics

    res = spark.createDataFrame(res_rows, "query_id long, doc_id string, rank int")
    qr = spark.createDataFrame(qrel_rows, "query_id long, doc_id string, gain long")
    out = ranking_metrics(res, qr, k=k, discounts_mi=W)
    return {r.query_id: r for r in out.collect()}


def test_hand_computed_ndcg_mrr_recall(spark):
    # run: a@1 (gain 1), b@2 (gain 3), miss@3; gold also has c (gain 2, not
    # retrieved).  dcg = 1*10000 + 3*6309 = 28927; ideal = 3*10000 + 2*6309
    # + 1*5000 = 47618; ndcg = 289270000 // 47618 = 6074
    got = _metrics(
        spark,
        [(1, "a", 1), (1, "b", 2), (1, "x", 3)],
        [(1, "a", 1), (1, "b", 3), (1, "c", 2)],
    )
    r = got[1]
    assert (r.n_gold, r.hits) == (3, 2)
    assert r.ndcg_mi == (1 * 10000 + 3 * 6309) * 10000 // (3 * 10000 + 2 * 6309 + 1 * 5000)
    assert r.rr_mi == 10000  # first relevant at rank 1
    assert r.recall_mi == 2 * 10000 // 3


def test_no_relevant_retrieved_scores_zero_and_unjudged_excluded(spark):
    got = _metrics(
        spark,
        [(1, "x", 1), (1, "y", 2), (99, "a", 1)],  # q99 has no judgments
        [(1, "a", 2), (2, "b", 1)],  # q2 judged but absent from the run
    )
    assert set(got) == {1, 2}  # gold defines the query universe
    assert (got[1].hits, got[1].ndcg_mi, got[1].rr_mi, got[1].recall_mi) == (0, 0, 0, 0)
    assert (got[2].hits, got[2].ndcg_mi, got[2].rr_mi, got[2].recall_mi) == (0, 0, 0, 0)


def test_ideal_truncates_to_k_and_rank_beyond_k_ignored(spark):
    # k=2: run hit at rank 3 is outside the cutoff; ideal uses top-2 gains
    got = _metrics(
        spark,
        [(1, "a", 1), (1, "b", 3)],
        [(1, "a", 1), (1, "b", 3), (1, "c", 2)],
        k=2,
    )
    r = got[1]
    assert r.hits == 1  # the rank-3 hit fell outside k
    assert r.ndcg_mi == (1 * 10000) * 10000 // (3 * 10000 + 2 * 6309)
    assert r.recall_mi == 1 * 10000 // 3


def test_cohen_kappa_hand_computed_and_sentinel(spark):
    from aiwhispr_spark.operators.evaluation import cohen_kappa

    # classic 2x2 table: 9 yy, 3 yn, 3 ny, 5 nn -> po = 14/20, marginals
    # 12y/8n on BOTH sides -> pe = (144+64)/400, kappa = 0.375 exactly
    rows = (
        [("y", "y")] * 9 + [("y", "n")] * 3 + [("n", "y")] * 3 + [("n", "n")] * 5
    )
    df = spark.createDataFrame(rows, "label_a string, label_b string")
    [r] = cohen_kappa(df).collect()
    n, agree = 20, 14
    rc = 12 * 12 + 8 * 8  # marginals: a 12y/8n, b 12y/8n
    assert (r.n, r.agree) == (n, agree)
    assert r.kappa_mi == (10000 * (n * agree - rc)) // (n * n - rc)  # 3750

    # degenerate: both raters constant -> p_e = 1 -> sentinel
    same = spark.createDataFrame([("x", "x")] * 5, "label_a string, label_b string")
    [r2] = cohen_kappa(same).collect()
    assert r2.kappa_mi == -20000

    # worse-than-chance: perfect disagreement on 2 balanced classes -> -10000
    flip = spark.createDataFrame(
        [("a", "b")] * 5 + [("b", "a")] * 5, "label_a string, label_b string"
    )
    [r3] = cohen_kappa(flip).collect()
    assert r3.kappa_mi == -10000


def test_gain_zero_judgments_dont_count_as_hits(spark):
    from aiwhispr_spark.operators.evaluation import ranking_metrics

    got = _metrics(
        spark,
        [(1, "a", 1), (1, "b", 2), (2, "x", 1)],
        [(1, "a", 0), (1, "b", 2), (1, "c", 0), (2, "x", 0)],  # a,c judged NON-relevant
    )
    r = got[1]
    assert r.n_gold == 1  # only b is relevant
    assert r.hits == 1  # the retrieved gain-0 doc a is NOT a hit
    assert r.recall_mi == 10000
    assert r.rr_mi == 5000  # first RELEVANT at rank 2
    # all-gain-0 query: stays in the output with undefined sentinels
    assert (got[2].n_gold, got[2].ndcg_mi, got[2].recall_mi) == (0, -1, -1)


def test_short_discount_table_raises(spark):
    import pytest

    from aiwhispr_spark.operators.evaluation import ranking_metrics

    res = spark.createDataFrame([(1, "a", 1)], "query_id long, doc_id string, rank int")
    qr = spark.createDataFrame([(1, "a", 1)], "query_id long, doc_id string, gain long")
    with pytest.raises(ValueError):  # silent NULL-drop of deep hits otherwise
        ranking_metrics(res, qr, k=10, discounts_mi=[10000, 6309])
