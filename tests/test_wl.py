"""1-WL color refinement semantics (graph.py::wl_color_refinement):
isomorphism invariance, structural distinction, direction/label
sensitivity, isolated-node handling."""

from __future__ import annotations


def _t(spark, rows):
    return spark.createDataFrame(rows, "subj string, pred string, obj string")


def test_wl_isomorphic_graphs_get_identical_color_multisets(spark):
    from aiwhispr_spark.operators.graph import wl_color_refinement

    g1 = _t(spark, [("a", "p", "b"), ("b", "p", "c"), ("c", "p", "a")])
    g2 = _t(spark, [("x", "p", "y"), ("y", "p", "z"), ("z", "p", "x")])
    c1 = sorted(r.wl_color for r in wl_color_refinement(g1).collect())
    c2 = sorted(r.wl_color for r in wl_color_refinement(g2).collect())
    assert c1 == c2
    # a directed 3-cycle is vertex-transitive: all colors equal
    assert len(set(c1)) == 1


def test_wl_distinguishes_path_positions(spark):
    from aiwhispr_spark.operators.graph import wl_color_refinement

    # directed path a→b→c→d: ends differ from middles, and after 2
    # rounds b and c differ too (their 2-hop trees are distinct)
    g = _t(spark, [("a", "p", "b"), ("b", "p", "c"), ("c", "p", "d")])
    colors = {r.node: r.wl_color for r in wl_color_refinement(g, rounds=2).collect()}
    assert len(set(colors.values())) == 4


def test_wl_edge_direction_and_label_matter(spark):
    from aiwhispr_spark.operators.graph import wl_color_refinement

    fwd = {r.node: r.wl_color for r in wl_color_refinement(
        _t(spark, [("a", "p", "b")])).collect()}
    # reversed edge: a's color must change (it now receives, not sends)
    rev = {r.node: r.wl_color for r in wl_color_refinement(
        _t(spark, [("b", "p", "a")])).collect()}
    assert fwd["a"] != rev["a"] and fwd["a"] == rev["b"]
    # different predicate: different colors
    lab = {r.node: r.wl_color for r in wl_color_refinement(
        _t(spark, [("a", "q", "b")])).collect()}
    assert fwd["a"] != lab["a"]


def test_wl_histogram_counts(spark):
    from aiwhispr_spark.operators.graph import wl_color_histogram

    # star: hub vs 3 identical leaves
    g = _t(spark, [("h", "p", "l1"), ("h", "p", "l2"), ("h", "p", "l3")])
    rows = sorted(
        wl_color_histogram(g).collect(), key=lambda r: -r.n_nodes
    )
    assert [r.n_nodes for r in rows] == [3, 1]
    assert rows[0].example_node == "l1" and rows[1].example_node == "h"
