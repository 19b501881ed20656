"""WordPiece + association-rule gates:

* WordPiece — greedy longest-match beats shorter pieces, ## continuation
  pieces never match at position 0 (and initial pieces never mid-word),
  all-or-nothing [UNK] on any uncovered position, digit words UNK;
* association rules — hand-computed support/confidence/lift on a 4-basket
  fixture; Apriori prune drops infrequent items BEFORE pair generation;
  asymmetric confidence (a→b ≠ b→a) pinned.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from aiwhispr_spark.operators.rulemine import association_rules_2item
from aiwhispr_spark.operators.textstats import wordpiece_encode

VOCAB = ["un", "##able", "##a", "##ble", "u", "n", "##n", "##u", "b", "##b",
         "##l", "##e", "a", "##hyp"]


def _enc(spark, words):
    df = spark.createDataFrame([(w,) for w in words], "word string")
    return {r["word"]: r for r in wordpiece_encode(df, VOCAB).collect()}


def test_wordpiece_greedy_longest_and_continuation(spark):
    got = _enc(spark, ["unable", "nab", "banana"])
    # longest-first: un + ##able (not un ##a ##ble, not u ##n ...)
    assert got["unable"]["pieces"] == "un ##able" and got["unable"]["n_pieces"] == 2
    # 'un' must NOT match mid-word; ##a is picked over nothing
    assert got["nab"]["pieces"] == "n ##a ##b"
    assert got["banana"]["pieces"] == "b ##a ##n ##a ##n ##a"


def test_wordpiece_unk_all_or_nothing(spark):
    got = _enc(spark, ["unz", "z", "ab1", "hyp"])
    # 'z' has no continuation piece -> whole word UNK even though 'un' matched
    assert got["unz"]["pieces"] == "[UNK]" and got["unz"]["is_unk"] == 1
    assert got["unz"]["n_pieces"] == 1
    assert got["z"]["is_unk"] == 1  # no initial 'z'
    assert got["ab1"]["is_unk"] == 1  # digit uncovered
    # '##hyp' exists but is continuation-only: no initial match -> UNK
    assert got["hyp"]["is_unk"] == 1


def test_association_rules_hand_computed(spark):
    # 4 baskets: {x,y} {x,y} {x} {y,w}; w infrequent at min_support=2
    rows = [(1, "x"), (1, "y"), (2, "x"), (2, "y"), (3, "x"), (4, "y"), (4, "w")]
    df = spark.createDataFrame(rows, "bid long, item string")
    out = {
        (r["antecedent"], r["consequent"]): r
        for r in association_rules_2item(df, "bid", "item", min_support=2).collect()
    }
    assert set(out) == {("x", "y"), ("y", "x")}  # w pruned before pairs
    xy = out[("x", "y")]
    assert (xy["supp_pair"], xy["supp_ante"], xy["supp_cons"]) == (2, 3, 3)
    assert xy["support_mi"] == 500_000  # 2/4
    assert xy["conf_mi"] == 666_666  # 2/3 floored
    assert xy["lift_mi"] == 888_888  # 2*4/(3*3)
    yx = out[("y", "x")]
    assert yx["conf_mi"] == 666_666 and yx["lift_mi"] == 888_888


def test_association_rules_asymmetric_confidence(spark):
    # x in 4 baskets, y in 2, pair in 2: conf(x->y)=1/2, conf(y->x)=1
    rows = [(1, "x"), (2, "x"), (3, "x"), (4, "x"), (1, "y"), (2, "y")]
    df = spark.createDataFrame(rows, "bid long, item string")
    out = {
        (r["antecedent"], r["consequent"]): r
        for r in association_rules_2item(df, "bid", "item", min_support=2).collect()
    }
    assert out[("x", "y")]["conf_mi"] == 500_000
    assert out[("y", "x")]["conf_mi"] == 1_000_000
    # duplicate (bid, item) rows must not inflate supports
    dup = spark.createDataFrame(rows + rows, "bid long, item string")
    out2 = {
        (r["antecedent"], r["consequent"]): r["supp_pair"]
        for r in association_rules_2item(dup, "bid", "item", min_support=2).collect()
    }
    assert out2[("x", "y")] == 2
