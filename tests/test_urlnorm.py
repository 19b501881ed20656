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


def test_crawl_change_stats_versions_vs_changes(spark):
    from aiwhispr_spark.operators.urlnorm import crawl_change_stats

    rows = [
        # page A churns A->B->A: 2 versions, 2 changes
        ("https://s.org/a", 1, "x"),
        ("https://s.org/a/", 2, "y"),
        ("https://s.org/a?utm_source=f", 3, "x"),
        # page B stable across 2 snapshots
        ("https://s.org/b", 1, "z"),
        ("https://s.org/b", 2, "z"),
        # page C single snapshot
        ("https://s.org/c", 9, "w"),
    ]
    df = spark.createDataFrame(rows, "url string, ts long, content string")
    got = {
        r.canon_url: (r.n_snapshots, r.n_versions, r.n_changes, r.first_ts, r.last_ts)
        for r in crawl_change_stats(df, ts_col="ts", content_col="content").collect()
    }
    assert got == {
        "https://s.org/a": (3, 2, 2, 1, 3),
        "https://s.org/b": (2, 1, 0, 1, 2),
        "https://s.org/c": (1, 1, 0, 9, 9),
    }


def test_host_suffixes_and_blocklist(spark):
    from pyspark.sql import functions as F

    from aiwhispr_spark.operators.urlnorm import filter_blocked_hosts, host_suffixes

    sufs = (
        spark.createDataFrame([("ads.x.org",)], "h string")
        .select(host_suffixes(F.col("h")).alias("s"))
        .first()
        .s
    )
    assert sufs == ["ads.x.org", "x.org", "org"]

    df = spark.createDataFrame(
        [
            (1, "https://ads.x.org/p"),   # blocked via suffix x.org
            (2, "https://x.org/p"),       # blocked exactly
            (3, "https://notx.org/p"),    # 'notx.org' != 'x.org' (label-safe)
            (4, "https://y.net/p"),
        ],
        "id long, url string",
    )
    bl = spark.createDataFrame([("x.org",)], "domain string")
    kept = sorted(r.id for r in filter_blocked_hosts(df, bl).collect())
    assert kept == [3, 4]

def test_crawl_schedule_priority_authority_times_churn(spark):
    from aiwhispr_spark.operators.urlnorm import (
        crawl_change_stats,
        crawl_schedule_priority,
    )

    # hot host (pr 900k), cold host (pr 100k); one churning + one stable
    # page per host -> order must be hot/churn > cold/churn > hot/stable...
    rows = []
    for host, churn_page, stable_page in [
        ("hot.org", "https://hot.org/churn", "https://hot.org/stable"),
        ("cold.org", "https://cold.org/churn", "https://cold.org/stable"),
    ]:
        for ts in (1, 2, 3):
            rows.append((churn_page, ts, f"v{ts}"))
            rows.append((stable_page, ts, "same"))
    snaps = spark.createDataFrame(rows, "url string, ts long, content string")
    ch = crawl_change_stats(snaps, ts_col="ts", content_col="content")
    pr = spark.createDataFrame(
        [("hot.org", 900000), ("cold.org", 100000)], "node string, pr_i long"
    )
    got = [
        (r.canon_url, r.priority_i)
        for r in crawl_schedule_priority(ch, pr, top_k=10).collect()
    ]
    assert got == [
        ("https://hot.org/churn", 2700000),   # 900k * (2+1)
        ("https://hot.org/stable", 900000),   # 900k * (0+1)
        ("https://cold.org/churn", 300000),   # 100k * (2+1)
        ("https://cold.org/stable", 100000),  # 100k * (0+1)
    ]


def test_crawl_schedule_priority_unranked_host_dropped(spark):
    from aiwhispr_spark.operators.urlnorm import (
        crawl_change_stats,
        crawl_schedule_priority,
    )

    snaps = spark.createDataFrame(
        [("https://known.org/a", 1, "x"), ("https://unknown.org/b", 1, "y")],
        "url string, ts long, content string",
    )
    ch = crawl_change_stats(snaps, ts_col="ts", content_col="content")
    pr = spark.createDataFrame([("known.org", 5)], "node string, pr_i long")
    got = crawl_schedule_priority(ch, pr).collect()
    assert [r.canon_url for r in got] == ["https://known.org/a"]
