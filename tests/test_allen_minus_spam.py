"""Unit gates for the session's temporal/graph-query/link-spam additions:
Allen interval relations (temporal.py::allen_relations), SPARQL MINUS
(graph_query.py::bgp_match_minus), and spam-mass estimation
(linkgraph.py::host_spam_mass).  The sf0.01 value gates vs DuckDB live in
__spark_entry__.py; these pin operator semantics on hand-built inputs."""

import pytest
from pyspark.sql import functions as F

from aiwhispr_spark.operators.graph_query import bgp_match_minus
from aiwhispr_spark.operators.temporal import allen_relations


def _iv(spark, rows):
    return spark.createDataFrame(rows, "subj string, fid long, s long, e long")


def _rels(spark, rows):
    out = allen_relations(_iv(spark, rows))
    return {(r["fid_a"], r["fid_b"]): r["rel"] for r in out.collect()}


def test_allen_all_thirteen_relations(spark):
    # every pair (1, k) below realizes exactly one of the 13 basic relations
    rows = [
        ("x", 1, 10, 20),
        ("x", 2, 10, 20),   # equals
        ("x", 3, 30, 40),   # before (1 before 3)
        ("x", 4, 0, 5),     # after  (1 after 4)
        ("x", 5, 20, 25),   # meets  (1 meets 5)
        ("x", 6, 5, 10),    # met_by (1 met_by 6)
        ("x", 7, 10, 30),   # starts (1 starts 7)
        ("x", 8, 10, 15),   # started_by (1 started_by 8)
        ("x", 9, 5, 20),    # finishes (1 finishes 9)
        ("x", 10, 12, 20),  # finished_by (1 finished_by 10)
        ("x", 11, 5, 30),   # during (1 during 11)
        ("x", 12, 12, 18),  # contains (1 contains 12)
        ("x", 13, 15, 30),  # overlaps (1 overlaps 13)
        ("x", 14, 5, 15),   # overlapped_by (1 overlapped_by 14)
    ]
    rels = _rels(spark, rows)
    expected = {
        2: "equals", 3: "before", 4: "after", 5: "meets", 6: "met_by",
        7: "starts", 8: "started_by", 9: "finishes", 10: "finished_by",
        11: "during", 12: "contains", 13: "overlaps", 14: "overlapped_by",
    }
    for k, rel in expected.items():
        assert rels[(1, k)] == rel, (k, rels[(1, k)])


def test_allen_exhaustive_no_nulls_and_subject_scoped(spark):
    # cross-subject pairs never emitted; every in-subject pair gets a label
    rows = [("a", 1, 0, 10), ("a", 2, 3, 7), ("b", 3, 0, 10)]
    out = allen_relations(_iv(spark, rows)).collect()
    assert {(r["fid_a"], r["fid_b"]) for r in out} == {(1, 2)}
    assert all(r["rel"] is not None for r in out)


def test_allen_drops_degenerate_and_caps_groups(spark):
    rows = [
        ("a", 1, 5, 5),    # empty interval: dropped
        ("a", 2, 9, 3),    # inverted: dropped
        ("a", 3, 0, 1),
        ("a", 4, 2, 3),
        ("b", 5, 0, 1), ("b", 6, 2, 3), ("b", 7, 4, 5),
    ]
    out = allen_relations(_iv(spark, rows))
    assert {(r["fid_a"], r["fid_b"]) for r in out.collect()} == {
        (3, 4), (5, 6), (5, 7), (6, 7),
    }
    capped = allen_relations(_iv(spark, rows), max_group=2)
    # subject b has 3 strict intervals > cap → dropped wholesale; a survives
    assert {(r["fid_a"], r["fid_b"]) for r in capped.collect()} == {(3, 4)}


def _triples(spark, rows):
    return spark.createDataFrame(rows, "subj string, pred string, obj string")


def test_bgp_minus_removes_compatible_bindings(spark):
    t = _triples(
        spark,
        [
            ("Y1", "acquired", "X1"),
            ("Y2", "acquired", "X2"),
            ("Y3", "acquired", "X3"),
            ("X1", "based_in", "CityA"),
            ("X2", "founded_by", "P1"),
        ],
    )
    out = bgp_match_minus(
        t,
        [("?y", "acquired", "?x")],
        [[("?x", "based_in", "?c")], [("?x", "founded_by", "?f")]],
    )
    assert {(r["y"], r["x"]) for r in out.collect()} == {("Y3", "X3")}


def test_bgp_minus_disjoint_group_raises(spark):
    t = _triples(spark, [("A", "p", "B"), ("C", "q", "D")])
    with pytest.raises(ValueError, match="shares no variable"):
        bgp_match_minus(t, [("?x", "p", "?y")], [[("?a", "q", "?b")]])


def test_host_spam_mass_flags_untrusted_authority(spark):
    # two-host farm (f1 ⇄ f2) plus a trusted seed s linking to a beneficiary
    # g: the farm's rank is pure spam mass (rel → 1e6), g's is endorsed.
    from aiwhispr_spark.operators.linkgraph import host_spam_mass

    def page(u, links):
        body = " ".join(f'<a href="{d}">x</a>' for d in links)
        return (u, f"<html><body>{body}</body></html>")

    docs = spark.createDataFrame(
        [
            page("https://s.example.org/a", ["https://g.example.org/b"]),
            page("https://f1.example.org/a", ["https://f2.example.org/a"]),
            page("https://f2.example.org/a", ["https://f1.example.org/a"]),
            page("https://g.example.org/b", ["https://s.example.org/a"]),
        ],
        "url string, html string",
    )
    rows = {
        r["node"]: r
        for r in host_spam_mass(
            docs, seed_hosts=["s.example.org"], iterations=5
        ).collect()
    }
    assert set(rows) == {
        "s.example.org", "g.example.org", "f1.example.org", "f2.example.org"
    }
    for farm in ("f1.example.org", "f2.example.org"):
        assert rows[farm]["tr_i"] == 0
        assert rows[farm]["mass_i"] == rows[farm]["pr_i"]
        assert rows[farm]["rel_i"] == 1000000
    assert rows["g.example.org"]["rel_i"] < 1000000
    # pr − tr is consistent row-wise (mass never exceeds pr)
    assert all(r["mass_i"] <= r["pr_i"] for r in rows.values())


def test_host_spam_mass_seed_absent_from_graph_sentinel(spark):
    from aiwhispr_spark.operators.linkgraph import host_spam_mass

    docs = spark.createDataFrame(
        [
            (
                "https://a.example.org/p",
                '<html><body><a href="https://b.example.org/q">x</a></body></html>',
            ),
            ("https://b.example.org/q", "<html><body>leaf</body></html>"),
        ],
        "url string, html string",
    )
    rows = {
        r["node"]: r
        for r in host_spam_mass(
            docs, seed_hosts=["offgraph.example.net"], iterations=3
        ).collect()
    }
    off = rows["offgraph.example.net"]
    assert off["pr_i"] == 0 and off["rel_i"] == -1
