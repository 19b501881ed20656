"""Sitemap-index expansion (sources/sitemap.py::parse_sitemap_index): child
extraction, url-block routing, loc-less drop.  The hash-value gate lives in
__spark_entry__ (sitemap_index_expand)."""

from __future__ import annotations

from aiwhispr_spark.sources.sitemap import (
    parse_sitemap_entries,
    parse_sitemap_index,
)

_MIXED = (
    "<sitemapindex>"
    "<sitemap><loc>https://h.example/sm/1.xml</loc>"
    "<lastmod>2024-03-15</lastmod></sitemap>"
    "<sitemap><loc> https://h.example/sm/2.xml </loc></sitemap>"
    "<sitemap></sitemap>"
    "<url><loc>https://h.example/page</loc></url>"
    "</sitemapindex>"
)


def _df(spark):
    return spark.createDataFrame(
        [("h.example", _MIXED)], "host string, sitemap_xml string"
    )


def test_children_extracted_and_url_blocks_ignored(spark):
    got = {
        (r.child_loc, r.lastmod_day)
        for r in parse_sitemap_index(_df(spark)).collect()
    }
    assert got == {
        ("https://h.example/sm/1.xml", "2024-03-15"),
        ("https://h.example/sm/2.xml", None),
    }


def test_entry_parser_sees_only_the_url_block(spark):
    got = [r.loc for r in parse_sitemap_entries(_df(spark)).collect()]
    assert got == ["https://h.example/page"]


def test_robots_sitemap_directives(spark):
    from aiwhispr_spark.operators.robots import sitemap_urls_from_robots

    txt = (
        "User-agent: *\nDisallow: /private\n"
        "Sitemap: https://h.example/a.xml  # primary\n"
        "siTEmap: https://h.example/b.xml\n"
        "Sitemap: https://h.example/b.xml\n"  # duplicate counts once
        "Allow: /public\n"
    )
    df = spark.createDataFrame([("h.example", txt)], "host string, robots_txt string")
    got = {r.sitemap_url for r in sitemap_urls_from_robots(df).collect()}
    assert got == {"https://h.example/a.xml", "https://h.example/b.xml"}
