"""Gates for Kneser-Ney bigram model (exact fraction + sum-to-1 identity),
ROUGE-L LCS (hand cases the planted oracle can't isolate), and bipartite
butterflies (hand-counted motifs + hub cap)."""

from fractions import Fraction

from pyspark.sql import functions as F

from aiwhispr_spark.operators.evaluation import rouge_l_pairs
from aiwhispr_spark.operators.linkgraph import bipartite_butterflies
from aiwhispr_spark.operators.textstats import kneser_ney_bigram_model


def test_kn_hand_fraction_and_sum_to_one(spark):
    # corpus: "a b a b a c" -> bigrams: ab, ba, ab, ba, ac
    d = spark.createDataFrame([(1, "a b a b a c")], "doc_id long, text string")
    rows = {r["bigram"]: r for r in kneser_ney_bigram_model(d).collect()}
    # counts: ab=2, ba=2, ac=1; N=3 types; a: ca=3, n1_left=2; b: ca=2,n1l=1
    # right: b n1r=1, a n1r=1, c n1r=1
    ab = rows["a b"]
    assert (ab["cab"], ab["ca"], ab["n1_left"], ab["n1_right"]) == (2, 3, 2, 1)
    # p(ab) = [max(8-3,0)*3 + 3*2*1] / (4*3*3) = (15+6)/36
    assert ab["p_kn_i"] == (21 * 10**9) // 36
    # sum-to-1 per context 'a' including unseen continuation mass:
    # P(b|a)+P(c|a) observed + lambda(a)*Pcont over unseen b' (none here:
    # vocab right-contexts are {b,a,c}; 'a a' unseen -> unseen mass term)
    n = 3
    d_disc = Fraction(3, 4)
    ca, n1l = 3, 2
    lam = d_disc * n1l / ca
    pcont = {"a": Fraction(1, n), "b": Fraction(1, n), "c": Fraction(1, n)}
    p_ab = (2 - d_disc) / ca + lam * pcont["b"]
    p_ac = (1 - d_disc) / ca + lam * pcont["c"]
    p_aa = lam * pcont["a"]  # unseen continuation
    assert p_ab + p_ac + p_aa == 1
    # and the emitted integers are the floor-scaled exact fractions
    assert ab["p_kn_i"] == int(p_ab * 10**9)


def test_rouge_l_hand_cases(spark):
    rows = [
        (1, ["a", "b", "c"], ["a", "b", "c"]),       # identical
        (2, ["a", "b"], ["x", "y", "z"]),            # disjoint
        (3, ["a", "x", "b", "y"], ["b", "a"]),       # lcs=1 (a or b alone)
        (4, ["t", "t", "q"], ["t", "t", "t"]),       # repeated tokens lcs=2
        (5, [], ["a"]),                              # empty candidate
    ]
    d = spark.createDataFrame(
        rows, "pair_id long, cand_toks array<string>, ref_toks array<string>"
    )
    out = {r["pair_id"]: r for r in rouge_l_pairs(d).collect()}
    assert out[1]["lcs"] == 3 and out[1]["f_i"] == 10000
    assert out[2]["lcs"] == 0 and out[2]["f_i"] == 0
    assert out[3]["lcs"] == 1 and out[3]["prec_i"] == 2500
    assert out[4]["lcs"] == 2 and out[4]["rec_i"] == 6666
    assert out[5]["lcs"] == 0 and out[5]["prec_i"] == 0 and out[5]["rec_i"] == 0


def test_butterflies_hand_counts(spark):
    # K_{2,2} on items {x,y} keys {1,2} -> n_common(x,y)=2 -> 1 butterfly;
    # item z shares only key 1 with x -> no butterfly
    rows = [("1", "x"), ("1", "y"), ("2", "x"), ("2", "y"), ("1", "z")]
    d = spark.createDataFrame(rows, "key string, item string")
    out = {r["item"]: r["n_butterflies"] for r in bipartite_butterflies(d).collect()}
    assert out == {"x": 1, "y": 1, "(all)": 1}


def test_butterflies_hub_cap_and_empty(spark):
    # hub key with fan-out 3 > cap 2 dropped -> no butterflies left
    rows = [("h", "x"), ("h", "y"), ("h", "z"), ("k", "x"), ("k", "y")]
    d = spark.createDataFrame(rows, "key string, item string")
    out = {r["item"]: r["n_butterflies"] for r in
           bipartite_butterflies(d, max_fanout=2).collect()}
    assert out == {"(all)": 0}
