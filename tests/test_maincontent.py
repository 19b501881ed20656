"""Unit gates for anchor mining (linkgraph.py) and link-density main-content
extraction (maincontent.py); sf-scale value gates are `anchor_alias_mining`
and `main_content_extract` in __spark_entry__.py."""

from pyspark.sql import functions as F

from aiwhispr_spark.operators.linkgraph import anchor_aliases, extract_anchors
from aiwhispr_spark.operators.maincontent import main_content_expr


def _df(spark, html):
    return spark.createDataFrame(
        [("https://a.org/p", html.encode())], "url string, html binary"
    )


def test_anchor_text_normalized_and_inner_tags_stripped(spark):
    html = (
        '<html><body><a href="https://b.net/x">  The <b>Big</b>\tCo  </a>'
        '<a href="/y">The Big Co</a><a href="mailto:z@q.io">skip</a></body></html>'
    )
    rows = extract_anchors(_df(spark, html)).collect()
    got = {(r.dst_url, r.anchor) for r in rows}
    assert got == {
        ("https://b.net/x", "the big co"),
        ("https://a.org/y", "the big co"),
    }


def test_multiline_anchor_is_not_invisible(spark):
    # pretty-printed template: anchor text on its own line
    html = '<ul><li><a href="/x">\n  Home\n</a></li></ul>'
    rows = extract_anchors(_df(spark, html)).collect()
    assert [(r.dst_url, r.anchor) for r in rows] == [("https://a.org/x", "home")]


def test_schemeless_src_mints_no_edges(spark):
    # a scheme-less src url must not resolve root-relative hrefs against an
    # empty base (':///x' edges) nor contribute '' hosts
    from aiwhispr_spark.operators.linkgraph import extract_links, host_edges

    df = spark.createDataFrame(
        [
            (
                "www.noscheme.com/page",
                b'<body><a href="/deep/x">rel</a><a href="https://b.net/y">abs</a></body>',
            )
        ],
        "url string, html binary",
    )
    links = extract_links(df).collect()
    assert [r.dst_url for r in links] == ["https://b.net/y"]
    assert host_edges(extract_links(df)).count() == 0  # no '' src_host node


def test_anchor_aliases_aggregate(spark):
    html = (
        '<body><a href="https://b.net/x">ACME</a> '
        '<a href="https://b.net/x?utm_source=s">acme</a> '
        '<a href="https://b.net/x">Acme Corp</a></body>'
    )
    got = {
        (r.dst_url, r.anchor): r.n_mentions
        for r in anchor_aliases(extract_anchors(_df(spark, html))).collect()
    }
    # canonicalization merges the utm variant into the same target
    assert got == {
        ("https://b.net/x", "acme"): 2,
        ("https://b.net/x", "acme corp"): 1,
    }


def _main(spark, html, pct=50):
    return (
        _df(spark, html)
        .select(
            main_content_expr(F.decode("html", "UTF-8"), max_link_pct=pct).alias("m")
        )
        .first()
        .m
    )


def test_main_content_drops_nav_keeps_prose(spark):
    html = (
        "<html><body>\n"
        "<p>A long paragraph of real article prose without any links.</p>\n"
        '<p><a href="/a">Home</a> <a href="/b">About</a> <a href="/c">Contact</a></p>\n'
        '<p>Prose citing <a href="/d">one source</a> among many other words.</p>\n'
        "</body></html>"
    )
    m = _main(spark, html)
    assert "real article prose" in m and "among many other words" in m
    assert "About" not in m  # nav block dropped
    assert "</body>" not in m  # whitespace-only trailing block dropped


def test_multiline_nav_anchor_still_counts_as_chrome(spark):
    # the block unit (newlines normalized before density) catches template
    # chrome whose anchors span physical lines
    html = (
        "<div>\n"
        '<ul><li><a href="/x">\n  Home sweet home\n</a></li>\n'
        '<li><a href="/y">\n  About\n</a></li></ul>\n'
        "</div>\n"
        "<p>Body prose paragraph long enough to dominate its density.</p>\n"
    )
    m = _main(spark, html)
    assert "Body prose paragraph" in m
    assert "Home sweet home" not in m


def test_density_boundary_is_integer_exact(spark):
    # visible=10, anchored=5 → 5·100 == 50·10 → kept at exactly 50%
    edge = '<p>12345<a href="/x">67890</a>'
    assert _main(spark, edge + "</p>") == edge
    # one more anchored char tips it over
    over = '<p>1234<a href="/x">567890</a>'
    assert _main(spark, over + "</p>") == ""
