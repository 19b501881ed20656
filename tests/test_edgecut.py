"""Partition edge-cut evaluation semantics (linkgraph.py::
partition_edgecut_eval): domain co-location zeroes intra-domain cuts."""

from __future__ import annotations


def test_domain_scheme_never_cuts_intra_domain_edges(spark):
    from aiwhispr_spark.operators.linkgraph import partition_edgecut_eval

    # all edges inside one registrable domain → domain scheme cut = 0,
    # hash scheme almost surely cuts some (hosts spread over 8 parts)
    rows = [
        (f"h{i}.site.org", f"h{(i * 3 + 1) % 20}.site.org", i + 1)
        for i in range(20)
        if i != (i * 3 + 1) % 20
    ]
    edges = spark.createDataFrame(
        rows, "src_host string, dst_host string, n_links long"
    )
    out = {r.scheme: r for r in partition_edgecut_eval(edges).collect()}
    assert out["domain"].cut_edges == 0 and out["domain"].cut_bp == 0
    # every host lands in the single domain partition
    assert out["domain"].balance_bp == 8 * 10000
    assert out["hash"].cut_edges > 0
    assert out["hash"].n_edges == out["domain"].n_edges == len(rows)


def test_cross_domain_edges_always_cut_under_domain_scheme_when_parts_differ(
    spark,
):
    from aiwhispr_spark.operators.linkgraph import partition_edgecut_eval

    edges = spark.createDataFrame(
        [("a.x.org", "b.y.net", 5), ("c.x.org", "d.x.org", 7)],
        "src_host string, dst_host string, n_links long",
    )
    out = {r.scheme: r for r in partition_edgecut_eval(edges).collect()}
    d = out["domain"]
    # the intra-x.org edge never cuts; the x.org→y.net edge cuts iff the
    # two domain hashes differ mod 8 — assert consistency either way
    assert d.cut_edges in (0, 1)
    assert d.n_edges == 2
