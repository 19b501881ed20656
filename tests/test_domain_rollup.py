"""Registrable-domain rollup (operators/urlnorm.py): eTLD+1 under the
documented two-level-suffix subset, single-label safety, per-domain counts.
The hash-value gate lives in __spark_entry__ (domain_rollup)."""

from __future__ import annotations

from pyspark.sql import functions as F

from aiwhispr_spark.operators.urlnorm import (
    domain_rollup,
    registrable_domain_expr,
)


def test_registrable_domain_edges(spark):
    cases = {
        "news.bbc.co.uk": "bbc.co.uk",
        "bbc.co.uk": "bbc.co.uk",
        "co.uk": "co.uk",       # the bare suffix stays itself
        "ads.x.org": "x.org",
        "x.org": "x.org",
        "localhost": "localhost",
        "a.b.com.au": "b.com.au",
    }
    df = spark.createDataFrame([(h,) for h in cases], "h string")
    got = {
        r.h: r.d
        for r in df.select(
            "h", registrable_domain_expr(F.col("h")).alias("d")
        ).collect()
    }
    assert got == cases


def test_rollup_counts_hosts_and_distinct_canonical_urls(spark):
    rows = [
        ("https://a.shop.co.uk/x",),
        ("https://b.shop.co.uk/x",),
        ("https://b.shop.co.uk/x?utm_source=f",),  # canonicalizes to /x
        ("https://b.shop.co.uk/y",),
    ]
    df = spark.createDataFrame(rows, "url string")
    got = {r.domain: (r.n_pages, r.n_hosts, r.n_urls) for r in domain_rollup(df).collect()}
    assert got == {"shop.co.uk": (4, 2, 3)}
