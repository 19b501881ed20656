"""ComplEx scoring + largest-remainder apportionment gates:

* ComplEx — asymmetric on directional relations (the DistMult limitation it
  exists to fix); exact value at dim=1 recomputed from hashlib outside
  Spark; reduces to DistMult when all imaginary parts are zeroed (checked
  structurally via the 4-term expansion at dim=1);
* apportionment — Σalloc == budget exactly on remainder-heavy fixtures,
  zero-weight keys visible with 0 and never winning a remainder seat,
  deterministic tie-break.
"""

from __future__ import annotations

import hashlib

from aiwhispr_spark.operators.kgscore import complex_scores, distmult_scores
from aiwhispr_spark.operators.mixing import apportion_largest_remainder


def _comp(name: str, i: int) -> int:
    h = int(hashlib.md5(f"{name}:{i}".encode()).hexdigest()[:8], 16)
    return h % 2001 - 1000


def _complex_ref(s, p, o, dim):
    tot = 0
    for i in range(dim):
        hre, him = _comp("re:" + s, i), _comp("im:" + s, i)
        rre, rim = _comp("re:rel:" + p, i), _comp("im:rel:" + p, i)
        tre, tim = _comp("re:" + o, i), _comp("im:" + o, i)
        tot += hre * rre * tre + him * rre * tim + hre * rim * tim - him * rim * tre
    return tot


def test_complex_matches_reference_and_is_asymmetric(spark):
    df = spark.createDataFrame(
        [("A", "founded", "B"), ("B", "founded", "A")],
        "subj string, pred string, obj string",
    )
    got = {(r["subj"], r["obj"]): r["score_i"] for r in complex_scores(df, dim=4).collect()}
    assert got[("A", "B")] == _complex_ref("A", "founded", "B", 4)
    assert got[("B", "A")] == _complex_ref("B", "founded", "A", 4)
    assert got[("A", "B")] != got[("B", "A")]  # the conjugate at work
    # DistMult on the same pair IS symmetric — the contrast this op fixes
    dm = {
        (r["subj"], r["obj"]): r["score_i"] for r in distmult_scores(df, dim=4).collect()
    }
    assert dm[("A", "B")] == dm[("B", "A")]


def test_apportionment_sums_to_budget_exactly(spark):
    # weights 1,1,1 with budget 10: quotas 3.33.. -> base 3+3+3, one extra
    # seat to the remainder tie-break winner (key asc)
    df = spark.createDataFrame(
        [("a", 1), ("b", 1), ("c", 1)], "src string, w long"
    )
    got = {r["key"]: r for r in apportion_largest_remainder(df, "src", "w", 10).collect()}
    assert sum(r["alloc"] for r in got.values()) == 10
    assert [got[k]["base_alloc"] for k in "abc"] == [3, 3, 3]
    assert got["a"]["alloc"] == 4 and got["b"]["alloc"] == 3  # tie: key asc


def test_apportionment_zero_weight_visible_never_seated(spark):
    df = spark.createDataFrame(
        [("a", 7), ("b", 0), ("c", None), ("d", 3)], "src string, w long"
    )
    got = {r["key"]: r for r in apportion_largest_remainder(df, "src", "w", 9).collect()}
    assert set(got) == {"a", "b", "c", "d"}  # NULL/zero rows stay visible
    assert got["b"]["alloc"] == 0 and got["c"]["alloc"] == 0
    assert sum(r["alloc"] for r in got.values()) == 9
    # 9*7=63 -> base 6 rem 3; 9*3=27 -> base 2 rem 7; the one extra seat
    # goes to d (remainder 7 beats 3)
    assert got["a"]["alloc"] == 6 and got["d"]["alloc"] == 3


def test_apportionment_all_zero_weights_degenerate(spark):
    # wsum = 0: every alloc is 0 (defined, visible) — never NULL, never a
    # key-order seat handout from n_extra = budget
    df = spark.createDataFrame([("a", 0), ("b", None)], "src string, w long")
    got = {r["key"]: r["alloc"] for r in apportion_largest_remainder(df, "src", "w", 5).collect()}
    assert got == {"a": 0, "b": 0}


def test_chi2_planted_discriminative_token(spark):
    """A token present in exactly the positive docs must dominate; a token
    in every doc scores 0 via the zero-margin guard."""
    from pyspark.sql import functions as F

    from aiwhispr_spark.operators.evaluation import chi2_feature_selection

    rows = []
    for i in range(10):
        lbl = 1 if i < 5 else 0
        toks = ["common"] + (["posonly"] if lbl else ["negonly"])
        for t in toks:
            rows.append((i, lbl, t))
    df = spark.createDataFrame(rows, "id long, lbl int, item string")
    got = {r["item"]: r for r in chi2_feature_selection(df, "lbl", "item").collect()}
    # perfect separation: chi2 = N = 10 -> scaled 100000
    assert got["posonly"]["chi2_i"] == 100_000
    assert got["negonly"]["chi2_i"] == 100_000
    assert got["common"]["chi2_i"] == 0
    assert (got["posonly"]["a"], got["posonly"]["b"]) == (5, 0)


def test_mcnemar_hand_computed(spark):
    from aiwhispr_spark.operators.evaluation import mcnemar_paired_test

    # b=6 (only a), c=1 (only b): chi2 = (|5|-1)^2/7 = 16/7 -> 22857
    rows = [(1, 1)] * 3 + [(1, 0)] * 6 + [(0, 1)] * 1 + [(0, 0)] * 2
    df = spark.createDataFrame(rows, "sys_a int, sys_b int")
    r = mcnemar_paired_test(df, "sys_a", "sys_b").collect()[0]
    assert (r["n_both_right"], r["n_only_a"], r["n_only_b"], r["n_both_wrong"]) == (3, 6, 1, 2)
    assert r["chi2_i"] == (10000 * 16) // 7
    # perfect agreement -> 0, not NULL
    df2 = spark.createDataFrame([(1, 1), (0, 0)], "sys_a int, sys_b int")
    assert mcnemar_paired_test(df2, "sys_a", "sys_b").collect()[0]["chi2_i"] == 0
    # |b-c| <= 1 floors to zero evidence
    df3 = spark.createDataFrame([(1, 0), (0, 1), (1, 0)], "sys_a int, sys_b int")
    assert mcnemar_paired_test(df3, "sys_a", "sys_b").collect()[0]["chi2_i"] == 0


def test_mcnemar_null_judgments_count_as_wrong(spark):
    # ADVICE r3: NULL scores used to NULL all four cells and vanish the row.
    # Contract: NULL judgment = wrong, visible in the counts.
    from aiwhispr_spark.operators.evaluation import mcnemar_paired_test

    rows = [(1, 1), (None, 1), (1, None), (None, None)]
    df = spark.createDataFrame(rows, "sys_a int, sys_b int")
    r = mcnemar_paired_test(df, "sys_a", "sys_b").collect()[0]
    # every input row lands in exactly one cell
    assert (
        r["n_both_right"] + r["n_only_a"] + r["n_only_b"] + r["n_both_wrong"]
    ) == 4
    assert (r["n_both_right"], r["n_only_a"], r["n_only_b"], r["n_both_wrong"]) == (
        1, 1, 1, 1,
    )


def test_chi2_margin_guard_is_overflow_safe(spark):
    # ADVICE r3: the old (a+b)*(c+d)*(a+c)*(b+d) product guard overflowed
    # int64 near N~55k docs.  The OR-of-margins guard must fire identically
    # on true zero margins and never on a large non-degenerate table.
    from aiwhispr_spark.operators.evaluation import chi2_feature_selection

    # item "every" appears in EVERY doc -> c = d = 0 margin -> chi2 = 0
    rows = [(i, i % 2, "every") for i in range(20)] + [
        (i, i % 2, "posonly") for i in range(0, 20, 2)
    ]
    df = spark.createDataFrame(rows, "id long, lbl int, item string")
    got = {r["item"]: r for r in chi2_feature_selection(df, "lbl", "item").collect()}
    assert got["every"]["chi2_i"] == 0
    assert got["posonly"]["chi2_i"] > 0
