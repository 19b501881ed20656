"""WAND/MaxScore pruned top-k (fulltext.py::wand_topk) — pruned ≡ exact on a
skewed corpus where the bound actually eliminates docs, plus the vacuous-θ
fallback (fewer driver-term postings than k → θ=0, no pruning, still exact)."""

from pyspark.sql import functions as F


def _corpus(spark):
    # 60 docs: 10 "hot" docs stuffed with the query terms, 50 long tail that
    # mention one query term once inside lots of filler — tail docs have a
    # tiny UB and a big length norm, so the bound prunes them
    rows = []
    for i in range(10):
        rows.append((i, ("alpha " * (5 + i % 3) + "beta " * 3 + "gamma ").strip()))
    for i in range(10, 60):
        filler = " ".join(f"w{i}x{j}" for j in range(30))
        rows.append((i, f"{filler} alpha"))
    return spark.createDataFrame(rows, "doc_id long, text string")


def _exact(spark, idx, dl, weights, k, norm_k=50):
    q = spark.createDataFrame(sorted(weights.items()), "token string, w long")
    s = (
        idx.join(F.broadcast(q), "token")
        .groupBy("id")
        .agg(F.sum(F.col("tf") * F.col("w")).alias("s"),
             F.countDistinct("token").cast("int").alias("n_terms"))
        .join(dl, "id")
        .select("id", F.expr(f"(s * 10000) div ({norm_k} + dl)").alias("score_i"), "n_terms")
        .orderBy(F.col("score_i").desc(), F.col("id"))
        .limit(k)
    )
    return [(r.id, r.score_i, r.n_terms) for r in s.collect()]


def test_pruned_equals_exact_and_actually_prunes(spark):
    from aiwhispr_spark.operators.fulltext import (
        build_inverted_index,
        wand_prune_stats,
        wand_topk,
    )

    docs = _corpus(spark)
    idx = build_inverted_index(docs)
    dl = idx.groupBy("id").agg(F.sum("tf").cast("long").alias("dl"))
    weights = {"alpha": 30, "beta": 20, "gamma": 10}
    got = [(r.id, r.score_i, r.n_terms) for r in wand_topk(idx, dl, weights, k=5).collect()]
    assert got == _exact(spark, idx, dl, weights, 5)
    n_or, n_sv, theta = wand_prune_stats(idx, dl, weights, k=5)
    assert n_or == 60  # every doc matches >=1 term (OR semantics)
    assert theta > 0
    assert n_sv < n_or  # the bound eliminated real candidates
    assert n_sv >= 5


def test_theta_fallback_when_driver_term_thin(spark):
    from aiwhispr_spark.operators.fulltext import (
        build_inverted_index,
        wand_prune_stats,
        wand_topk,
    )

    docs = _corpus(spark)
    idx = build_inverted_index(docs)
    dl = idx.groupBy("id").agg(F.sum("tf").cast("long").alias("dl"))
    # gamma appears in 10 docs < k=20 and dominates UB -> θ=0 path
    weights = {"gamma": 1000, "alpha": 1}
    got = [(r.id, r.score_i, r.n_terms) for r in wand_topk(idx, dl, weights, k=20).collect()]
    assert got == _exact(spark, idx, dl, weights, 20)
    _, n_sv, theta = wand_prune_stats(idx, dl, weights, k=20)
    assert theta == 0 and n_sv == 60  # vacuous pruning is visible, not silent
