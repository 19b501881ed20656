"""Sitemap discovery tests (sources/sitemap.py) — entry parsing edge cases
and the frontier status matrix; the driver gate (`sitemap_frontier_diff`)
re-derives both in DuckDB over the synthetic fixture."""

from aiwhispr_spark.sources.sitemap import parse_sitemap_entries, sitemap_frontier

XML = """<?xml version="1.0"?>
<urlset>
  <url>
    <loc> https://a.org/p1 </loc>
    <lastmod>
      2024-01-10
    </lastmod>
  </url>
  <url><loc>https://a.org/p2</loc><lastmod>2024-02-01T09:15:00+00:00</lastmod></url>
  <url>
    <loc>https://a.org/p3</loc>
  </url>
  <url>
    <lastmod>2024-01-02</lastmod>
  </url>
</urlset>
"""


def _entries(spark):
    df = spark.createDataFrame(
        [("a.org", XML)], "host string, sitemap_xml string"
    )
    return parse_sitemap_entries(df)


def test_parse_trims_whitespace_and_drops_locless_blocks(spark):
    got = {r["loc"]: r["lastmod_day"] for r in _entries(spark).collect()}
    assert got == {
        "https://a.org/p1": "2024-01-10",   # multiline lastmod
        "https://a.org/p2": "2024-02-01",   # W3C datetime -> ISO day prefix
        "https://a.org/p3": None,           # no lastmod
    }


def test_frontier_status_matrix(spark):
    state = spark.createDataFrame(
        [
            ("https://a.org/p1", "2024-01-15"),  # crawled after lastmod -> fresh
            ("https://a.org/p2", "2024-01-15"),  # lastmod after crawl  -> stale
            ("https://a.org/p3", "2024-01-15"),  # no lastmod          -> unknown
        ],
        "url string, last_crawl_day string",
    )
    got = {
        r["url"]: r["status"]
        for r in sitemap_frontier(_entries(spark), state).collect()
    }
    assert got == {
        "https://a.org/p1": "fresh",
        "https://a.org/p2": "stale",
        "https://a.org/p3": "unknown",
    }


def test_uncrawled_url_is_new(spark):
    state = spark.createDataFrame(
        [("https://a.org/p1", "2024-01-15")], "url string, last_crawl_day string"
    )
    got = {
        r["url"]: r["status"]
        for r in sitemap_frontier(_entries(spark), state).collect()
    }
    assert got["https://a.org/p2"] == "new"
    assert got["https://a.org/p3"] == "new"


def test_same_day_lastmod_is_fresh(spark):
    # 'stale' requires STRICTLY after: same-day modification was captured
    state = spark.createDataFrame(
        [("https://a.org/p1", "2024-01-10")], "url string, last_crawl_day string"
    )
    got = {
        r["url"]: r["status"]
        for r in sitemap_frontier(_entries(spark), state).collect()
    }
    assert got["https://a.org/p1"] == "fresh"


def test_no_python_stage_in_plan(spark):
    df = spark.createDataFrame([("a.org", XML)], "host string, sitemap_xml string")
    plan = (
        parse_sitemap_entries(df)._jdf.queryExecution().executedPlan().toString()
    )
    assert "Python" not in plan  # pure JVM regex + explode
