"""Co-citation / bibliographic coupling (operators/linkgraph.py): wedge
counts, hub-fanout cap semantics (degrees counted AFTER the drop), transpose
relationship.  The hash-value gates live in __spark_entry__
(host_cocitation_pairs / host_coupling_pairs vs wedge SQL twins)."""

from __future__ import annotations

from aiwhispr_spark.operators.linkgraph import cocitation_pairs, coupling_pairs


def _edges(spark, rows):
    return spark.createDataFrame(rows, "src string, dst string")


def test_cocitation_counts_and_jaccard(spark):
    # s1 and s2 both cite a and b; s3 cites only a
    e = _edges(spark, [("s1", "a"), ("s1", "b"), ("s2", "a"), ("s2", "b"), ("s3", "a")])
    got = {(r.a, r.b): (r.n_common, r.deg_a, r.deg_b, r.jaccard_i)
           for r in cocitation_pairs(e).collect()}
    # a cited by 3, b by 2, common citers 2 -> jaccard 2/3
    assert got == {("a", "b"): (2, 3, 2, 666666)}


def test_hub_cap_drops_key_and_its_degree_contribution(spark):
    # hub cites everything (fanout 3 > cap 2): contributes NO wedges and NO
    # degree; s1/s2 still co-cite a,b
    e = _edges(
        spark,
        [("hub", "a"), ("hub", "b"), ("hub", "c"),
         ("s1", "a"), ("s1", "b"), ("s2", "a"), ("s2", "b")],
    )
    got = {(r.a, r.b): (r.n_common, r.deg_a, r.deg_b)
           for r in cocitation_pairs(e, max_fanout=2).collect()}
    assert got == {("a", "b"): (2, 2, 2)}


def test_coupling_is_the_transpose(spark):
    e = _edges(spark, [("x", "t1"), ("y", "t1"), ("x", "t2"), ("y", "t2")])
    got = {(r.a, r.b): r.n_common for r in coupling_pairs(e).collect()}
    assert got == {("x", "y"): 2}
