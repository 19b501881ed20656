"""Milne-Witten relatedness (linkgraph.py::milne_witten_relatedness) — the
WLM formula over exact wedge counts, hand-computed; clamp and sentinel."""


def test_milne_witten_hand_computed_clamp_and_sentinel(spark):
    import math

    from aiwhispr_spark.operators.linkgraph import milne_witten_relatedness

    rows = []
    rows += [(f"k{i}", "x") for i in (1, 2, 3)]          # deg 3
    rows += [(f"k{i}", "y") for i in (2, 3)]             # deg 2, common(x,y)=2
    rows += [(f"k{i}", "a") for i in range(1, 9)]        # deg 8
    rows += [("k1", "b"), ("k9", "b")]                   # deg 2, common(a,b)=1
    rows += [(f"k{i}", "z") for i in range(1, 11)]       # deg 10 = N -> sentinel
    rows += [(f"k{i}", "w") for i in range(1, 11)]       # deg 10, pair (w,z)
    rel = spark.createDataFrame(rows, "key string, item string")
    got = {(r.a, r.b): r.mw_mi for r in milne_witten_relatedness(rel).collect()}
    exp_xy = round(10000 * (1 - (math.log(3) - math.log(2)) / (math.log(10) - math.log(2))))
    assert got[("x", "y")] == exp_xy
    assert got[("a", "b")] == 0  # negative WLM clamps to 0 (less related than chance)
    assert got[("w", "z")] == -1  # item in EVERY key -> undefined denominator
