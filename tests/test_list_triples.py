"""Heading-labeled HTML list mining (operators/structured.py::list_triples):
label adjacency rule, unlabeled-list silence, inner-tag strip, empty-item
drop, ordered positions, og:title subject with url fallback.  The hash-value
gate lives in __spark_entry__ (html_list_triples vs a closed-form oracle)."""

from __future__ import annotations

from aiwhispr_spark.operators.structured import list_triples


def _rows(spark, html, url="u1"):
    df = spark.createDataFrame([(url, html.encode())], "url string, html binary")
    return [
        (r.subj, r.pred, r.obj, r.pos) for r in list_triples(df).collect()
    ]


def test_labeled_lists_emit_ordered_items_and_others_stay_silent(spark):
    html = (
        '<head><meta property="og:title" content="Acme"/></head>'
        "<h2>Products</h2><ul><li>Alpha</li><li>Beta <b>2</b></li><li></li></ul>"
        "<h3>Team Members</h3>\n<ol><li>Ada</li></ol>"
        "<ul><li>anonymous nav</li></ul>"
        "<h2>Far</h2><p>x</p><ul><li>separated</li></ul>"
    )
    assert _rows(spark, html) == [
        ("Acme", "list:products", "Alpha", 1),
        ("Acme", "list:products", "Beta 2", 2),
        ("Acme", "list:team_members", "Ada", 1),
    ]


def test_url_fallback_subject_and_tagged_heading_not_swallowed(spark):
    # no og:title -> subj = url; a heading containing tags is NOT a plain-
    # text label, and its list must not be claimed by an EARLIER heading
    html = (
        "<h2>First</h2><p>gap</p>"
        "<h2>Has <b>tag</b></h2><ul><li>item</li></ul>"
        "<h2>Plain</h2><ul><li>kept</li></ul>"
    )
    assert _rows(spark, html) == [("u1", "list:plain", "kept", 1)]
