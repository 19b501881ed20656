"""Pagination stitching (operators/pagination.py): chain discovery, order,
singletons, ambiguous-claimant election, cycles, attribute order.  The
hash-value gate lives in __spark_entry__ (pagination_series vs a
closed-form DuckDB oracle)."""

from __future__ import annotations

from aiwhispr_spark.operators.pagination import (
    extract_next_links,
    reassemble_series,
    stitch_pagination,
)


def _pages(spark, rows):
    return spark.createDataFrame(rows, "url string, html string, text string")


def _next(url):
    return f'<link rel="next" href="{url}">'


def test_chain_is_stitched_in_order(spark):
    rows = [
        ("p1", _next("p2"), "one"),
        # href before rel: attribute order must not matter
        ("p2", f'<link href="p3" rel="next">', "two"),
        ("p3", "<p>end</p>", "three"),
        ("q1", "", "solo"),
    ]
    got = {
        r.series: (r.n_pages, r.page_urls, r.full_text)
        for r in reassemble_series(stitch_pagination(_pages(spark, rows))).collect()
    }
    assert got == {
        "p1": (3, "p1,p2,p3", "one\ntwo\nthree"),
        "q1": (1, "q1", "solo"),
    }


def test_first_next_tag_wins_and_decoys_ignored(spark):
    rows = [
        ("p1", '<link rel="prev" href="zz">' + _next("p2") + _next("p9"), "a"),
        ("p2", '<link rel="stylesheet" href="s.css">', "b"),
        ("p9", "", "c"),
    ]
    got = {
        (r.url, r.series, r.page_no)
        for r in stitch_pagination(_pages(spark, rows)).collect()
    }
    assert got == {("p1", "p1", 1), ("p2", "p1", 2), ("p9", "p9", 1)}


def test_ambiguous_target_keeps_min_claimant(spark):
    # both a1 and b1 declare next=t: min claimant a1 keeps the chain
    rows = [("a1", _next("t"), "x"), ("b1", _next("t"), "y"), ("t", "", "z")]
    got = {
        (r.url, r.series, r.page_no)
        for r in stitch_pagination(_pages(spark, rows)).collect()
    }
    assert got == {("a1", "a1", 1), ("b1", "b1", 1), ("t", "a1", 2)}


def test_cycle_degrades_to_singletons(spark):
    rows = [("p1", _next("p2"), "a"), ("p2", _next("p1"), "b")]
    got = {
        (r.url, r.series, r.page_no)
        for r in stitch_pagination(_pages(spark, rows)).collect()
    }
    assert got == {("p1", "p1", 1), ("p2", "p2", 1)}


def test_self_reference_dropped(spark):
    rows = [("p1", _next("p1"), "a")]
    assert extract_next_links(_pages(spark, rows)).count() == 0
