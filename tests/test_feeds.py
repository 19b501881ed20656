"""RSS/Atom feed source (sources/feeds.py): parsing-contract pins on
hand-built feeds (the hash gate lives in __spark_entry__ rss_atom_entries
vs the closed-form oracle)."""

from __future__ import annotations

from aiwhispr_spark.sources.feeds import feed_frontier, parse_feed_entries


def _feeds(spark, rows):
    return spark.createDataFrame(rows, "host string, feed_xml string")


def test_rss_cdata_title_rfc822_day_and_linkless_drop(spark):
    xml = (
        "<rss><channel>"
        "<item><title><![CDATA[T & x]]></title><link>https://h/a</link>"
        "<pubDate>Tue, 3 Feb 2026 01:02:03 GMT</pubDate></item>"
        "<item><title>nolink</title></item>"
        "</channel></rss>"
    )
    [row] = parse_feed_entries(_feeds(spark, [("h", xml)])).collect()
    assert (row.host, row.link, row.title, row.pub_day, row.feed_type) == (
        "h",
        "https://h/a",
        "T & x",
        "2026-02-03",
        "rss",
    )


def test_rss_unknown_month_yields_null_day(spark):
    xml = (
        "<rss><channel><item><link>https://h/a</link>"
        "<pubDate>Tue, 3 Foo 2026 01:02:03 GMT</pubDate></item></channel></rss>"
    )
    [row] = parse_feed_entries(_feeds(spark, [("h", xml)])).collect()
    assert row.pub_day is None and row.title is None


def test_atom_rel_self_skipped_and_iso_day(spark):
    xml = (
        '<feed xmlns="http://www.w3.org/2005/Atom">'
        '<link rel="self" href="https://h/feed.xml"/>'
        "<entry>"
        '<link rel="self" href="https://h/e/self"/>'
        '<link rel="alternate" href="https://h/e/1"/>'
        "<title>A</title><updated>2026-12-31T23:59:59Z</updated>"
        "</entry>"
        "<entry>"
        '<link rel="edit" href="https://h/e/edit"/>'
        "<title>only-non-alternate</title>"
        "</entry>"
        "</feed>"
    )
    [row] = parse_feed_entries(_feeds(spark, [("h", xml)])).collect()
    assert (row.link, row.title, row.pub_day, row.feed_type) == (
        "https://h/e/1",
        "A",
        "2026-12-31",
        "atom",
    )


def test_feed_frontier_delegates_to_sitemap_policy(spark):
    xml = (
        "<rss><channel>"
        "<item><link>https://h/new</link>"
        "<pubDate>Mon, 10 Aug 2026 00:00:00 GMT</pubDate></item>"
        "<item><link>https://h/stale</link>"
        "<pubDate>Mon, 10 Aug 2026 00:00:00 GMT</pubDate></item>"
        "</channel></rss>"
    )
    entries = parse_feed_entries(_feeds(spark, [("h", xml)]))
    state = spark.createDataFrame(
        [("https://h/stale", "2026-08-01")], "url string, last_crawl_day string"
    )
    got = {r.url: r.status for r in feed_frontier(entries, state).collect()}
    assert got == {"https://h/new": "new", "https://h/stale": "stale"}
