"""Link-graph gates (operators/linkgraph.py). The sf-scale value gates (vs
closed-form DuckDB oracles over the linked corpus) are
`link_extract_canonical` / `host_graph_edges` / `host_pagerank_5` in
__spark_entry__.py; these pin extraction, resolution, skip rules, and host
aggregation on hand-built pages."""

import pytest

from aiwhispr_spark.operators.linkgraph import (
    extract_links,
    host_edges,
    host_of,
    host_pagerank,
)

PAGES = [
    (
        "https://www.a.org/idx",
        "<html><body>"
        '<a href="https://b.net/x?utm_source=s&q=1">abs</a>'
        '<a class="nav" href="/deep/page/">rel</a>'
        '<a href="HTTP://C.COM:80/y#frag">caps</a>'
        '<a href="mailto:x@y.z">m</a>'
        '<a href="javascript:void(0)">j</a>'
        '<a href="#sec">f</a>'
        '<a href="docrel/part">d</a>'
        '<a href="">empty</a>'
        "</body></html>",
    ),
    (
        "https://b.net/home",
        '<html><body><a href="https://www.a.org/idx">back</a>'
        '<a href="https://www.a.org/idx">again</a></body></html>',
    ),
]


def _df(spark):
    rows = [(u, h.encode("utf-8")) for u, h in PAGES]
    return spark.createDataFrame(rows, "url string, html binary")


def test_extract_resolve_canonicalize(spark):
    got = {
        (r.src_url, r.dst_url)
        for r in extract_links(_df(spark)).distinct().collect()
    }
    assert got == {
        ("https://www.a.org/idx", "https://b.net/x?q=1"),
        ("https://www.a.org/idx", "https://www.a.org/deep/page"),
        ("https://www.a.org/idx", "http://c.com/y"),
        ("https://b.net/home", "https://www.a.org/idx"),
    }


def test_duplicate_links_survive_extraction(spark):
    rows = extract_links(_df(spark)).collect()
    back = [r for r in rows if r.src_url == "https://b.net/home"]
    assert len(back) == 2  # host_edges is where aggregation happens


def test_host_edges_weights_and_self_loop_drop(spark):
    self_loop = (
        "https://www.a.org/two",
        '<html><body><a href="/self">s</a>'
        '<a href="https://b.net/x">out</a></body></html>',
    )
    df = _df(spark).union(
        _df(spark).sparkSession.createDataFrame(
            [(self_loop[0], self_loop[1].encode())], "url string, html binary"
        )
    )
    got = {
        (r.src_host, r.dst_host): r.n_links
        for r in host_edges(extract_links(df)).collect()
    }
    assert got == {
        ("www.a.org", "b.net"): 2,  # one per page, self-loop dropped
        ("www.a.org", "c.com"): 1,
        ("b.net", "www.a.org"): 2,  # duplicate link counted twice
    }
    kept = host_edges(extract_links(df), keep_self=True).collect()
    assert ("www.a.org", "www.a.org") in {(r.src_host, r.dst_host) for r in kept}


def test_host_of_strips_port_and_case(spark):
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [("https://WWW.X.ORG:8443/p?q=1",)], "u string"
    ).select(host_of(F.col("u")).alias("h"))
    assert df.first().h == "www.x.org"


def test_host_pagerank_mass_and_order(spark):
    pr = {
        r.node: r.pr
        for r in host_pagerank(_df(spark), iterations=3, num_partitions=2).collect()
    }
    assert set(pr) == {"www.a.org", "b.net", "c.com"}
    assert sum(pr.values()) == pytest.approx(1.0, abs=1e-9)
    # a.org gets b.net's whole vote plus dangling mass; c.com only 1/3 of a's
    assert pr["www.a.org"] > pr["b.net"] > 0
    assert pr["b.net"] == pytest.approx(pr["c.com"], rel=1e-9)


def test_host_outlink_profile_diversity_and_self(spark):
    from aiwhispr_spark.operators.linkgraph import host_outlink_profile

    links = spark.createDataFrame(
        [
            ("https://a.org/1", "https://b.org/x"),
            ("https://a.org/1", "https://b.org/y"),   # same dst host again
            ("https://a.org/2", "https://a.org/self"),
            ("https://c.org/1", "https://d.org/x"),
        ],
        "src_url string, dst_url string",
    )
    got = {r.src_host: r for r in host_outlink_profile(links).collect()}
    a = got["a.org"]
    assert (a.n_links, a.n_dst_hosts, a.n_self) == (3, 2, 1)
    assert a.diversity_i == round(10000 * 2 / 3)
    assert got["c.org"].diversity_i == 10000


def test_personalized_pagerank_trust_locality(spark):
    # chain seed -> s1 -> s2, plus an isolated spam ring (x <-> y) that no
    # trusted path reaches: ring nodes must end with EXACTLY zero trust
    # (teleport never lands there and no contribution flows in).
    from aiwhispr_spark.operators.graph import personalized_pagerank

    edges = spark.createDataFrame(
        [("seed", "s1"), ("s1", "s2"), ("x", "y"), ("y", "x")],
        "src string, dst string",
    )
    seeds = spark.createDataFrame([("seed",)], "node string")
    tr = {
        r.node: r.pr
        for r in personalized_pagerank(edges, seeds, iterations=4).collect()
    }
    assert tr["x"] == 0.0 and tr["y"] == 0.0
    assert tr["seed"] > 0 and tr["s1"] > 0 and tr["s2"] > 0
    # total mass stays bounded by 1 (leaks only via dangling s2 -> tele)
    assert 0 < sum(tr.values()) <= 1.0 + 1e-9


def test_personalized_pagerank_empty_seeds_is_empty(spark):
    from aiwhispr_spark.operators.graph import personalized_pagerank

    edges = spark.createDataFrame([("a", "b")], "src string, dst string")
    seeds = spark.createDataFrame([], "node string")
    assert personalized_pagerank(edges, seeds, iterations=2).count() == 0


def test_link_reciprocity_counts(spark):
    # a<->b reciprocal; a->c one-way; c->a one-way back to a (so c's single
    # out-edge IS reciprocated); duplicate edges collapse first.
    from aiwhispr_spark.operators.linkgraph import link_reciprocity

    edges = spark.createDataFrame(
        [("a", "b"), ("b", "a"), ("a", "c"), ("c", "a"), ("a", "c"), ("d", "d")],
        "src string, dst string",
    )
    got = {r.host: r for r in link_reciprocity(edges).collect()}
    assert "d" not in got  # self-loop-only host drops out
    a = got["a"]
    assert (a.n_out, a.n_reciprocal, a.reciprocity_i) == (2, 2, 1000000)
    assert (got["b"].n_out, got["b"].n_reciprocal) == (1, 1)
    assert (got["c"].n_out, got["c"].n_reciprocal) == (1, 1)


def test_mirror_host_pairs_partial_overlap(spark):
    from aiwhispr_spark.operators.linkgraph import mirror_host_pairs

    rows = (
        [("h1", f"page{i}") for i in range(10)]
        + [("h2", f"page{i}") for i in range(10)]          # full mirror of h1
        + [("h3", f"page{i}") for i in range(5)]           # half mirror
        + [("h3", f"other{i}") for i in range(5)]
        + [("h4", f"unique{i}") for i in range(10)]        # no overlap
    )
    df = spark.createDataFrame(rows, "host string, text string")
    got = {
        (r.a, r.b): (r.n_common, r.jaccard_i)
        for r in mirror_host_pairs(df, min_shared=5, min_jaccard_i=300_000).collect()
    }
    assert got[("h1", "h2")] == (10, 1_000_000)
    assert got[("h1", "h3")] == (5, (1_000_000 * 5) // 15)
    assert ("h1", "h4") not in got and ("h2", "h4") not in got
    assert set(got) == {("h1", "h2"), ("h1", "h3"), ("h2", "h3")}


def test_host_pagerank_drift_absent_epoch_zero(spark):
    from aiwhispr_spark.operators.linkgraph import host_pagerank_drift

    # epoch A: a->b only; epoch B: b->c only (host a vanishes, c is new)
    pages = [
        ("https://a.org/0", '<a href="https://b.org/x">l</a>', 0),
        ("https://b.org/1", '<a href="https://c.org/y">l</a>', 1),
    ]
    df = spark.createDataFrame(
        [(u, h.encode(), e) for u, h, e in pages], "url string, html binary, epoch int"
    )
    from pyspark.sql import functions as SF

    got = {r.node: r for r in host_pagerank_drift(df, SF.col("epoch") == 1).collect()}
    assert got["c.org"].pr_a_i == 0 and got["c.org"].pr_b_i > 0
    assert got["a.org"].pr_b_i == 0 and got["a.org"].pr_a_i > 0
    for r in got.values():
        assert r.drift_i == r.pr_b_i - r.pr_a_i


def test_personalized_pagerank_out_of_graph_seed_holds_mass(spark):
    from aiwhispr_spark.operators.graph import personalized_pagerank

    edges = spark.createDataFrame([("a", "b")], "src string, dst string")
    seeds = spark.createDataFrame([("ghost",), ("a",)], "node string")
    tr = {r.node: r.pr for r in personalized_pagerank(edges, seeds, iterations=3).collect()}
    # the absent seed appears and keeps nonzero rank (teleport + dangling)
    assert "ghost" in tr and tr["ghost"] > 0
    assert tr["a"] > 0 and tr["b"] > 0
