"""Typed KG edges from anchor text (operators/linkgraph.py::
anchor_typed_edges): pattern table routing, page-subject carry (no
self-join), duplicate collapse, nav-noise silence, url-fallback subject.
The hash-value gate lives in __spark_entry__ (anchor_typed_edges)."""

from __future__ import annotations

from aiwhispr_spark.operators.linkgraph import anchor_typed_edges


def _edges(spark, html, url="https://w.example/p"):
    df = spark.createDataFrame([(url, html.encode())], "url string, html binary")
    return {
        (r.subj, r.pred, r.obj) for r in anchor_typed_edges(df).collect()
    }


def test_pattern_routing_dedup_and_noise(spark):
    html = (
        '<head><meta property="og:title" content="Acme"/></head>'
        '<a href="https://a.example/">Official Website</a>'
        '<a href="https://a.example/">official website</a>'
        '<a href="/imprint">Impressum</a>'
        '<a href="https://g.example/r">source</a>'
        '<a href="https://x.example/">read more</a>'
    )
    assert _edges(spark, html) == {
        ("Acme", "homepage", "https://a.example"),
        ("Acme", "contact_page", "https://w.example/imprint"),
        ("Acme", "source_repo", "https://g.example/r"),
    }


def test_url_fallback_subject_and_word_boundaries(spark):
    # no og:title -> subj = url; 'website builder' must NOT match the
    # anchored ^website$ pattern
    html = (
        '<a href="https://a.example/">website</a>'
        '<a href="https://b.example/">website builder</a>'
    )
    assert _edges(spark, html) == {
        ("https://w.example/p", "homepage", "https://a.example"),
    }
