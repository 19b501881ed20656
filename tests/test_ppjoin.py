"""PPJoin prefix-filtered all-pairs Jaccard join gates:

* exactness — pruned output must equal the brute-force all-pairs result on a
  corpus with planted near-dups, overlapping-but-below-threshold pairs, and
  disjoint docs (the prefix + length filters are EXACTNESS-PRESERVING, so any
  divergence is a filter bug, not "approximation");
* pruning non-vacuous — the prefix-token candidate join must try strictly
  fewer pairs than the full token self-join would (otherwise the prefix slice
  isn't slicing);
* integer math — jaccard_i is exact cross-multiplied scaled math.
"""

from __future__ import annotations

from itertools import combinations

from aiwhispr_spark.operators.dedup import _ppjoin_parts, ppjoin_jaccard_pairs


def _brute_pairs(rows, threshold, scale=1_000_000):
    toks = {i: set(t.lower().strip().split()) - {""} for i, t in rows}
    toks = {i: s for i, s in toks.items() if s}
    t_i = int(round(scale * threshold))
    out = set()
    for a, b in combinations(sorted(toks), 2):
        c = len(toks[a] & toks[b])
        u = len(toks[a]) + len(toks[b]) - c
        if scale * c >= t_i * u:
            out.add((a, b, len(toks[a]), len(toks[b]), c, (scale * c) // u))
    return out


CORPUS = [
    (1, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
    (2, "alpha beta gamma delta epsilon zeta eta theta iota kappa xx1"),  # J=10/11
    (3, "alpha beta gamma delta epsilon other words entirely here now"),  # J low vs 1
    (4, "totally disjoint vocabulary with nothing shared at all ok"),
    (5, "ALPHA BETA gamma delta epsilon zeta eta theta iota kappa"),  # case-folds to 1
    (6, "alpha"),  # tiny doc: length filter must kill it vs 1 before verify
    (7, ""),  # empty: dropped by sz > 0
]


def test_ppjoin_equals_brute_force(spark):
    df = spark.createDataFrame(CORPUS, "doc_id long, text string")
    got = {
        tuple(r)
        for r in ppjoin_jaccard_pairs(df, threshold=0.8)
        .select("a", "b", "n_a", "n_b", "n_common", "jaccard_i")
        .collect()
    }
    want = _brute_pairs(CORPUS, 0.8)
    assert got == want
    # sanity on the fixture: the planted pairs actually qualify
    assert (1, 2, 10, 11, 10, 909090) in want
    assert (1, 5, 10, 10, 10, 1000000) in want


def test_ppjoin_threshold_one_is_exact_duplicates_only(spark):
    df = spark.createDataFrame(CORPUS, "doc_id long, text string")
    got = {
        (r["a"], r["b"])
        for r in ppjoin_jaccard_pairs(df, threshold=1.0).collect()
    }
    assert got == {(1, 5)}


def test_ppjoin_prunes_candidates(spark):
    """Candidates from the prefix join must be strictly fewer than the pairs
    a full token self-join would generate (the scale claim)."""
    df = spark.createDataFrame(CORPUS, "doc_id long, text string")
    base, cand = _ppjoin_parts(df, "text", "doc_id", 0.8, 1_000_000)
    n_cand = cand.count()
    post = base.selectExpr("id", "explode(toks) AS tok")
    full = (
        post.alias("l")
        .join(post.alias("r"), "tok")
        .filter("l.id < r.id")
        .selectExpr("l.id AS a", "r.id AS b")
        .distinct()
        .count()
    )
    assert n_cand < full, (n_cand, full)
    # and every qualifying pair is still among the candidates
    got = {(r["a"], r["b"]) for r in cand.collect()}
    for a, b, *_ in _brute_pairs(CORPUS, 0.8):
        assert (a, b) in got
