"""Gates for revalidation planning, autocomplete, and Matryoshka eval:

* revalidation — each RFC 7234-lite arm on a hand-built cache state,
  max-age precedence over validators, heuristic cross-multiplication;
* autocomplete — trie semantics (term completes its own short prefix),
  frequency-then-lexicographic rank, min_len cutoff;
* matryoshka — full-dim overlap is k by construction; truncated overlap
  can only find true neighbors (subset sanity) on an orthogonal fixture.
"""

from __future__ import annotations

from aiwhispr_spark.operators.fulltext import autocomplete_prefix_topk
from aiwhispr_spark.operators.robots import revalidation_plan
from aiwhispr_spark.operators.similarity import matryoshka_overlap_eval

NOW = 1_000_000


def test_revalidation_arms(spark):
    rows = [
        # url, fetched, etag, lm, max_age
        ("fresh", NOW - 50, None, None, 100),
        ("stale_etag", NOW - 500, 'W/"x"', NOW - 600, 100),  # etag beats lm
        ("stale_lm", NOW - 500, None, NOW - 4_500, None),  # life 4000 <= 5000
        ("heur", NOW - 500, None, NOW - 10_000, None),  # 5000 < 9500
        ("bare", NOW - 500, None, None, None),
        ("ma_zero", NOW - 500, 'W/"y"', None, 0),  # max-age 0 -> validator
    ]
    df = spark.createDataFrame(
        rows, "url string, fetched_ep long, etag string, lm_ep long, max_age_s long"
    )
    got = {r["url"]: r for r in revalidation_plan(df, NOW).collect()}
    assert got["fresh"]["decision"] == "fresh" and got["fresh"]["cond_header"] == ""
    assert got["stale_etag"]["decision"] == "revalidate_etag"
    assert got["stale_etag"]["cond_header"] == "if-none-match"
    assert got["stale_lm"]["decision"] == "revalidate_lm"
    assert got["heur"]["decision"] == "fresh_heuristic"
    assert got["heur"]["lifetime_s"] == 9_500
    assert got["bare"]["decision"] == "refetch"
    assert got["ma_zero"]["decision"] == "revalidate_etag"
    assert got["fresh"]["lifetime_s"] == -1  # sentinel when max-age present


def test_autocomplete_rank_and_self_completion(spark):
    df = spark.createDataFrame(
        [("spark spark spark spa sp x",)], "text string"
    )
    got = {
        (r["prefix"], r["rnk"]): (r["term"], r["freq"])
        for r in autocomplete_prefix_topk(df, k=3).collect()
    }
    # 'sp' completions by freq: spark(3), spa(1) < sp(1) lexicographically? ->
    # ties (sp,1) vs (spa,1) break by term: 'sp' < 'spa'
    assert got[("sp", 1)] == ("spark", 3)
    assert got[("sp", 2)] == ("sp", 1)
    assert got[("sp", 3)] == ("spa", 1)
    # 'spark' completes itself at its full length (<= max_len)
    assert got[("spark", 1)] == ("spark", 3)
    # 'x' is below min_len: no prefix rows at all
    assert not any(p.startswith("x") for p, _ in got)


def test_matryoshka_full_dim_self_gate_and_orthogonal_prefix(spark):
    # 8-dim toy: ids 0..5; vectors built so the 4-dim prefix ranking
    # differs from the full: neighbor 5 hides its similarity in dims 5-8
    rows = []
    for i in range(6):
        v = [0.0] * 8
        v[i % 4] = 1.0
        if i == 5:
            v = [0.0, 0.0, 0.0, 0.0, 1.0, 1.0, 1.0, 1.0]
        rows.append((i, v))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = {
        (r["query_id"], r["dims"]): r["overlap_at_k"]
        for r in matryoshka_overlap_eval(
            df, dims=(4, 8), n_queries=2, k=2
        ).collect()
    }
    assert out[(0, 8)] == 2 and out[(1, 8)] == 2  # self-gate
    assert all(0 <= v <= 2 for v in out.values())


def test_mutual_topk_requires_reciprocity(spark):
    from aiwhispr_spark.operators.similarity import mutual_topk_pairs

    # a,b identical (mutual best); c closer to a than to d, but a's best is
    # b -> (a,c) must NOT appear at k=1; d isolated-ish
    rows = [
        (1, [1.0, 0.0, 0.0]),
        (2, [1.0, 0.0, 0.0]),
        (3, [0.7, 0.7, 0.0]),
        (4, [0.0, 0.0, 1.0]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    got = {(r["a"], r["b"]) for r in mutual_topk_pairs(df, k=1).collect()}
    assert (1, 2) in got
    assert (1, 3) not in got and (2, 3) not in got
    # at k=2, a's top-2 includes c and c's top-2 includes a -> pair appears
    got2 = {(r["a"], r["b"]) for r in mutual_topk_pairs(df, k=2).collect()}
    assert (1, 3) in got2
    # output is direction-free: no (b, a) duplicates
    assert all(a < b for a, b in got2)


def test_bitext_margin_mutual_and_threshold(spark):
    from aiwhispr_spark.operators.similarity import bitext_margin_mine

    # Even ids = source arm, odd = target arm.  0<->1 and 2<->3 are planted
    # near-duplicates (mutual best with high margin).  5's RAW-cosine best
    # src is 0 (0.949 vs 0.894 for 4), but 0's dense neighborhood (sum_k2 =
    # 1.944) drags margin(0,5) to 1.002 while margin(4,5) = 1.019 — the
    # margin's hubness correction hands 5 to 4, and (4,5) is mutual.  The
    # mutual veto shows on (0,5): 0's forward best is 1, so (0,5) dies even
    # though it is 5's best raw cosine.  6 is zero-norm and must be
    # dropped, not crash.
    rows = [
        (0, [1.0, 0.0, 0.0, 0.0]),
        (1, [0.99, 0.1, 0.0, 0.0]),
        (2, [0.0, 0.0, 1.0, 0.0]),
        (3, [0.0, 0.1, 0.99, 0.0]),
        (4, [0.5, 0.5, 0.0, 0.0]),
        (5, [0.9, 0.3, 0.0, 0.0]),
        (6, [0.0, 0.0, 0.0, 0.0]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = bitext_margin_mine(df, k=2, margin_bp_min=0).collect()
    pairs = {(r["src"], r["dst"]) for r in out}
    assert (0, 1) in pairs and (2, 3) in pairs
    # hubness correction: margin (not raw cosine) decides the backward best
    assert (4, 5) in pairs
    # the mutual veto: 5's raw-cosine-best src is 0, but 0's forward best
    # is 1 -> (0,5) must die
    assert (0, 5) not in pairs
    # src is unique (one forward-best row per source at most)
    srcs = [r["src"] for r in out]
    assert len(srcs) == len(set(srcs))
    # zero-norm vector never appears on either side
    assert all(r["src"] != 6 and r["dst"] != 6 for r in out)
    # margins are integers; the planted near-dups beat margin 1.0
    m = {(r["src"], r["dst"]): r["margin_bp"] for r in out}
    assert m[(0, 1)] > 10000 and m[(2, 3)] > 10000
    # a margin_bp_min above the best pair's margin empties the output
    hi = max(m.values()) + 1
    assert bitext_margin_mine(df, k=2, margin_bp_min=hi).count() == 0


def test_bitext_candidates_restrict_pairs(spark):
    from aiwhispr_spark.operators.similarity import bitext_margin_mine

    rows = [
        (0, [1.0, 0.0]),
        (1, [0.9, 0.1]),
        (2, [0.0, 1.0]),
        (3, [0.1, 0.9]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    # candidate tier only proposes the cross pairs (0,3) and (2,1): the
    # true matches (0,1)/(2,3) are invisible, so the election must run
    # over the candidate set only — the 100 TB contract.
    cand = spark.createDataFrame([(0, 3), (2, 1)], "src long, dst long")
    out = bitext_margin_mine(df, k=2, margin_bp_min=0, candidates=cand).collect()
    pairs = {(r["src"], r["dst"]) for r in out}
    assert pairs <= {(0, 3), (2, 1)}
    assert (0, 1) not in pairs
