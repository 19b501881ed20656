"""URL canonicalization + latest-crawl dedup gates (operators/urlnorm.py).
The sf-scale value gates (vs DuckDB twins) are `url_canonicalize` and
`url_latest_crawl` in __spark_entry__.py."""

import datetime as dt

from pyspark.sql import functions as F

from aiwhispr_spark.operators.urlnorm import canonical_url_expr, latest_crawl_per_url


def _canon(spark, urls):
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    return [r.c for r in df.select(canonical_url_expr(F.col("url")).alias("c")).collect()]


def test_case_port_fragment_normalization(spark):
    assert _canon(
        spark,
        [
            "HTTPS://WWW.Example.COM:443/Path/",
            "http://x.org:80/a#frag",
            "http://x.org:8080/a",
        ],
    ) == [
        "https://www.example.com/Path",
        "http://x.org/a",
        "http://x.org:8080/a",
    ]


def test_tracking_params_dropped_rest_sorted(spark):
    assert _canon(
        spark,
        [
            "https://x.org/p?utm_source=feed&b=2&a=1&fbclid=abc",
            "https://x.org/p?gclid=1&ref=tw",
            "https://x.org/p?",
        ],
    ) == ["https://x.org/p?a=1&b=2", "https://x.org/p", "https://x.org/p"]


def test_path_case_preserved_host_lowered(spark):
    assert _canon(spark, ["https://X.org/CaseSensitive/Path"]) == [
        "https://x.org/CaseSensitive/Path"
    ]


def test_root_and_empty_path(spark):
    assert _canon(spark, ["https://x.org/", "https://x.org"]) == [
        "https://x.org",
        "https://x.org",
    ]


def test_latest_crawl_keeps_max_ts(spark):
    rows = [
        ("https://X.org/a?utm_source=1", dt.datetime(2024, 1, 1), "old"),
        ("https://x.org/a/", dt.datetime(2024, 2, 1), "new"),
        ("https://x.org/b", dt.datetime(2024, 1, 5), "only"),
    ]
    df = spark.createDataFrame(rows, "url string, warc_ts timestamp, body string")
    out = {r.canon_url: r for r in latest_crawl_per_url(df).collect()}
    assert set(out) == {"https://x.org/a", "https://x.org/b"}
    assert out["https://x.org/a"].body == "new"
    assert out["https://x.org/a"].url == "https://x.org/a/"  # raw url preserved
    assert sorted(out["https://x.org/a"].asDict()) == [
        "body",
        "canon_url",
        "url",
        "warc_ts",
    ]
