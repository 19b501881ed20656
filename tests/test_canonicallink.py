"""rel=canonical election (operators/canonicallink.py): map defaulting,
first-tag wins, attribute order, keeper election in/out of corpus.  The
hash-value gate lives in __spark_entry__ (canonical_clusters vs a
closed-form DuckDB oracle)."""

from __future__ import annotations

from aiwhispr_spark.operators.canonicallink import canonical_clusters, canonical_map


def _pages(spark, rows):
    return spark.createDataFrame(rows, "url string, html string")


def _canon(url):
    return f'<link rel="canonical" href="{url}">'


def test_map_defaults_and_declarations(spark):
    rows = [
        ("a", _canon("head")),
        # href before rel: attribute order must not matter
        ("b", '<link href="head" rel="canonical">'),
        ("head", "<p>hi</p>"),
        ("self", _canon("self")),  # self-declaration is not a declaration
    ]
    got = {
        (r.url, r.canonical, r.declared_i)
        for r in canonical_map(_pages(spark, rows)).collect()
    }
    assert got == {
        ("a", "head", 1), ("b", "head", 1), ("head", "head", 0), ("self", "self", 0)
    }


def test_first_tag_wins_and_decoys_ignored(spark):
    rows = [("a", '<link rel="alternate" href="x">' + _canon("c1") + _canon("c2"))]
    got = canonical_map(_pages(spark, rows)).collect()
    assert [(r.canonical, r.declared_i) for r in got] == [("c1", 1)]


def test_cluster_keeper_in_corpus(spark):
    rows = [("a", _canon("head")), ("b", _canon("head")), ("head", "")]
    got = {
        (r.canonical, r.keeper, r.n_members, r.in_corpus_i)
        for r in canonical_clusters(_pages(spark, rows)).collect()
    }
    assert got == {("head", "head", 3, 1)}


def test_cluster_keeper_external_target(spark):
    # target not crawled: min member keeps
    rows = [("b", _canon("ext")), ("a", _canon("ext"))]
    got = {
        (r.canonical, r.keeper, r.n_members, r.in_corpus_i)
        for r in canonical_clusters(_pages(spark, rows)).collect()
    }
    assert got == {("ext", "a", 2, 0)}
