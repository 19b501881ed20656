"""Structured-data extraction (operators/structured.py): hostile-arm unit
pins + plan shape.  The hash-value gates live in __spark_entry__
(jsonld_triples / meta_og_cards / infobox_triples / structured_entity_stats
vs closed-form DuckDB oracles); these tests pin the parsing contract on
hand-built pages so a regex regression fails with a readable diff."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from aiwhispr_spark.operators.structured import (
    infobox_triples,
    jsonld_triples,
    meta_cards,
    structured_entity_stats,
)


def _docs(spark, pages: dict[str, str]):
    rows = [(u, h.encode("utf-8")) for u, h in sorted(pages.items())]
    return spark.createDataFrame(rows, "url string, html binary")


def test_jsonld_decoy_script_and_malformed_json_ignored(spark):
    docs = _docs(
        spark,
        {
            "https://a/1": (
                '<script type="text/javascript">var x = {"name": "nope"};</script>'
                '<script type="application/ld+json">'
                '{"@type": "Organization", "name": "Acme"}</script>'
            ),
            # malformed JSON → from_json NULL → zero triples, no error
            "https://a/2": '<script type="application/ld+json">{oops</script>',
        },
    )
    rows = jsonld_triples(docs).collect()
    assert {(r.src_url, r.subj, r.pred, r.obj) for r in rows} == {
        ("https://a/1", "Acme", "rdf:type", "organization")
    }


def test_jsonld_graph_and_single_quote_attr(spark):
    docs = _docs(
        spark,
        {
            "https://g/1": (
                "<script type='application/ld+json'>\n"
                '{"@graph": [\n'
                '  {"@type": "Organization", "name": "Org", "url": "https://o.example"},\n'
                '  {"@type": "Person", "name": "Pat", "worksFor": "Org"}\n'
                "]}\n</script>"
            )
        },
    )
    got = {(r.subj, r.pred, r.obj) for r in jsonld_triples(docs).collect()}
    assert got == {
        ("Org", "rdf:type", "organization"),
        ("Org", "schema:url", "https://o.example"),
        ("Pat", "rdf:type", "person"),
        ("Pat", "schema:worksFor", "Org"),
    }


def test_meta_cards_attr_order_and_quote_styles(spark):
    docs = _docs(
        spark,
        {
            "https://m/1": (
                "<title> Spaced   Title </title>"
                "<meta content='Swapped' property='og:type' />"
                '<meta property="og:title" content="T1"/>'
            ),
            "https://m/2": "<p>no head markup at all</p>",
        },
    )
    rows = {r.url: r for r in meta_cards(docs).collect()}
    r1 = rows["https://m/1"]
    assert (r1.title, r1.og_title, r1.og_type, r1.description) == (
        "Spaced Title",
        "T1",
        "Swapped",
        None,
    )
    r2 = rows["https://m/2"]
    assert (r2.title, r2.og_title, r2.og_type, r2.description) == (
        None,
        None,
        None,
        None,
    )


def test_infobox_scoping_tag_strip_and_url_fallback_subject(spark):
    docs = _docs(
        spark,
        {
            "https://i/1": (
                '<meta property="og:title" content="Ent"/>'
                "<table><tr><th>Nope</th><td>decoy</td></tr></table>"
                '<table class="x infobox y">'
                '<tr><th scope="row">Head  Quarters</th>'
                '<td><a href="/wiki/C">The <b>City</b></a></td></tr>'
                "<tr><th>Empty</th><td>  </td></tr>"
                "</table>"
            ),
            # no og:title → subject falls back to the page url
            "https://i/2": (
                '<table class="infobox"><tr><th>K</th><td>V</td></tr></table>'
            ),
        },
    )
    got = {(r.src_url, r.subj, r.pred, r.obj) for r in infobox_triples(docs).collect()}
    assert got == {
        ("https://i/1", "Ent", "infobox:head_quarters", "The City"),
        ("https://i/2", "https://i/2", "infobox:k", "V"),
    }


def test_structured_stats_merges_both_sources(spark):
    docs = _docs(
        spark,
        {
            "https://s/1": (
                '<meta property="og:title" content="Acme"/>'
                '<script type="application/ld+json">'
                '{"@type": "Organization", "name": "Acme"}</script>'
                '<table class="infobox"><tr><th>HQ</th><td>Berlin</td></tr></table>'
            )
        },
    )
    [row] = structured_entity_stats(docs).collect()
    assert (row.subj, row.n_facts, row.n_pages, row.n_sources) == ("Acme", 2, 1, 2)


def test_structured_extractors_are_pure_jvm_narrow_plans(spark):
    """All three extractors must stay expression-only (no python stage) and
    shuffle-free — at 100 TB they are map work fused with the WARC scan."""
    docs = _docs(spark, {"https://p/1": "<p>x</p>"})
    for df in (jsonld_triples(docs), meta_cards(docs), infobox_triples(docs)):
        plan = df._jdf.queryExecution().executedPlan().treeString()
        assert "Python" not in plan and "Exchange" not in plan


def test_data_table_header_keyed_rows(spark):
    from aiwhispr_spark.operators.structured import data_table_triples

    docs = _docs(
        spark,
        {
            # header row of th cells; body rows: ragged extra cell dropped,
            # empty cell dropped, inner tags stripped from cell text
            "https://t/1": (
                "<p>intro</p><table border=1>"
                "<tr><th>Company</th><th>HQ City</th><th>Founded</th></tr>"
                "<tr><td><b>Acme</b> Corp</td><td>Berlin</td><td>1999</td></tr>"
                "<tr><td>Globex</td><td></td><td>2001</td><td>ragged</td></tr>"
                "</table>"
            ),
            # first row is NOT a th header → table contributes nothing
            "https://t/2": (
                "<table><tr><td>a</td><td>b</td></tr>"
                "<tr><td>c</td><td>d</td></tr></table>"
            ),
            # single-column header (<2 th) → not a data table
            "https://t/3": (
                "<table><tr><th>Only</th></tr><tr><td>x</td></tr></table>"
            ),
        },
    )
    rows = data_table_triples(docs).collect()
    assert {(r.src_url, r.subj, r.pred, r.obj) for r in rows} == {
        ("https://t/1", "Acme Corp", "table:hq_city", "Berlin"),
        ("https://t/1", "Acme Corp", "table:founded", "1999"),
        ("https://t/1", "Globex", "table:founded", "2001"),
    }


def test_data_table_no_shuffle_plan(spark):
    from aiwhispr_spark.operators.structured import data_table_triples

    docs = _docs(spark, {"https://t/1": "<table></table>"})
    plan = data_table_triples(docs)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_breadcrumb_taxonomy_edges(spark):
    from aiwhispr_spark.operators.structured import breadcrumb_taxonomy

    docs = _docs(
        spark,
        {
            # anchors + trailing span crumb; inner tag strips
            "https://b/1": (
                '<nav class="site breadcrumb top">'
                '<a href="/c">Home</a> &gt; <a href="/c/e"><b>Electronics</b></a>'
                " &gt; <span>Cameras</span></nav>"
            ),
            # same trail again on another page → n_pages=2 on its edges
            "https://b/2": (
                "<nav class='breadcrumb'>"
                "<a href='/c'>Home</a> > <a href='/c/e'>Electronics</a>"
                " > <span>Cameras</span></nav>"
            ),
            # non-breadcrumb nav ignored; single-crumb trail asserts nothing
            "https://b/3": (
                '<nav class="menu"><a href="/x">X</a><a href="/y">Y</a></nav>'
                '<nav class="breadcrumb"><a href="/c">Home</a></nav>'
            ),
        },
    )
    rows = breadcrumb_taxonomy(docs).collect()
    assert {(r.child, r.parent, r.n_pages) for r in rows} == {
        ("Electronics", "Home", 2),
        ("Cameras", "Electronics", 2),
    }


def test_rdfa_scopes_curie_types_and_nameless_silence(spark):
    from aiwhispr_spark.operators.structured import rdfa_triples

    docs = _docs(
        spark,
        {
            # CURIE typeof; content attr beats inner text; head meta
            # property= tags sit OUTSIDE any scope and must not leak
            "https://r/1": (
                '<meta property="og:title" content="Decoy"/>'
                '<div vocab="https://schema.org/" typeof="schema:Person">'
                '<span property="name">Ada</span>'
                '<span property="jobTitle">Eng</span>'
                '<meta property="birthDate" content="1815-12-10"></div>'
            ),
            # IRI typeof reduces to the local name; section container
            "https://r/2": (
                '<section typeof="https://schema.org/Organization">'
                '<span property="name">Acme</span>'
                '<span property="location">Berlin</span></section>'
            ),
            # nameless scope emits nothing
            "https://r/3": (
                '<div typeof="schema:Thing"><span property="label">X</span></div>'
            ),
        },
    )
    rows = rdfa_triples(docs).collect()
    assert {(r.src_url, r.subj, r.pred, r.obj, r.itype) for r in rows} == {
        ("https://r/1", "Ada", "jobTitle", "Eng", "Person"),
        ("https://r/1", "Ada", "birthDate", "1815-12-10", "Person"),
        ("https://r/2", "Acme", "location", "Berlin", "Organization"),
    }


def test_rdfa_is_pure_jvm_narrow_plan(spark):
    from aiwhispr_spark.operators.structured import rdfa_triples

    docs = _docs(spark, {"https://p/1": "<p>x</p>"})
    plan = rdfa_triples(docs)._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan and "Exchange" not in plan


def test_layout_fingerprint_template_invariance(spark):
    # same template, different content -> SAME hash; different structure ->
    # different hash; closing tags and attributes ignored
    from pyspark.sql import functions as F

    from aiwhispr_spark.operators.structured import layout_fingerprint_expr

    rows = [
        (1, '<html><body><div class="a"><p>hello</p></div></body></html>'),
        (2, "<html><body><div><p>totally other words</p></div></body></html>"),
        (3, "<html><body><table><tr><td>x</td></tr></table></body></html>"),
    ]
    df = spark.createDataFrame(rows, "id long, html string")
    got = {r.id: r.h for r in df.select("id", layout_fingerprint_expr(F.col("html")).alias("h")).collect()}
    assert got[1] == got[2]
    assert got[1] != got[3]
