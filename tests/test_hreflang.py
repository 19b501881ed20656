"""hreflang clustering (operators/hreflang.py): attribute order, decoys,
cluster election, target-only members.  The hash-value gate lives in
__spark_entry__ (hreflang_clusters vs a closed-form DuckDB oracle)."""

from __future__ import annotations

from aiwhispr_spark.operators.hreflang import (
    extract_hreflang_links,
    hreflang_clusters,
)


def _pages(spark, rows):
    return spark.createDataFrame(rows, "url string, html string")


def test_extract_any_attribute_order_and_decoys(spark):
    html = (
        '<head><link rel="alternate" hreflang="de" href="https://x/de">'
        '<link href="https://x/en" rel="alternate" hreflang="en">'
        '<link hreflang="fr" href="https://x/fr" rel="alternate">'
        '<link rel="stylesheet" href="s.css">'
        '<link rel="alternate" type="application/rss+xml" href="feed.xml">'
        "</head>"
    )
    got = {
        (r.href, r.lang)
        for r in extract_hreflang_links(_pages(spark, [("https://x/en", html)])).collect()
    }
    assert got == {
        ("https://x/de", "de"),
        ("https://x/en", "en"),
        ("https://x/fr", "fr"),
    }


def test_clusters_elect_min_url_and_keep_target_only_members(spark):
    # two pages declare a third (fr) that was never crawled: it still joins
    # the cluster with its declared lang
    def html(*pairs):
        return "".join(
            f'<link rel="alternate" hreflang="{l}" href="{h}">' for l, h in pairs
        )

    pages = _pages(
        spark,
        [
            ("https://x/en", html(("en", "https://x/en"), ("de", "https://x/de"),
                                  ("fr", "https://x/fr"))),
            ("https://x/de", html(("en", "https://x/en"), ("de", "https://x/de"),
                                  ("fr", "https://x/fr"))),
        ],
    )
    got = {(r.cluster, r.url, r.lang) for r in hreflang_clusters(pages).collect()}
    assert got == {
        ("https://x/de", "https://x/de", "de"),
        ("https://x/de", "https://x/en", "en"),
        ("https://x/de", "https://x/fr", "fr"),
    }


def test_x_default_and_region_tags_accepted(spark):
    html = (
        '<link rel="alternate" hreflang="x-default" href="https://x/">'
        '<link rel="alternate" hreflang="en-GB" href="https://x/uk">'
    )
    got = {
        (r.href, r.lang)
        for r in extract_hreflang_links(_pages(spark, [("https://x/", html)])).collect()
    }
    assert got == {("https://x/", "x-default"), ("https://x/uk", "en-GB")}


def test_disjoint_groups_stay_disjoint(spark):
    def html(h):
        return f'<link rel="alternate" hreflang="de" href="{h}">'

    pages = _pages(
        spark,
        [("https://a/en", html("https://a/de")), ("https://b/en", html("https://b/de"))],
    )
    clusters = {r.url: r.cluster for r in hreflang_clusters(pages).collect()}
    assert clusters["https://a/en"] == "https://a/de"
    assert clusters["https://b/en"] == "https://b/de"
    assert len(set(clusters.values())) == 2
