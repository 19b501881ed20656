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
    assert "About" not in m  # nav line dropped
    assert "<html><body>" not in m  # zero-visible lines dropped


def test_density_boundary_is_integer_exact(spark):
    # visible=10, anchored=5 → 5·100 == 50·10 → kept at exactly 50%
    edge = "<p>12345<a href=\"/x\">67890</a></p>"
    assert _main(spark, "<body>\n" + edge + "\n</body>") == edge
    # one more anchored char tips it over
    over = "<p>1234<a href=\"/x\">567890</a></p>"
    assert _main(spark, "<body>\n" + over + "\n</body>") == ""
