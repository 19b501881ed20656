"""Unit gates for sorted-neighborhood blocking (linking.py::
snm_candidate_pairs) and mobile/AMP variant clustering (urlnorm.py::
mobile_variant_clusters).  sf0.01 value gates live in __spark_entry__.py."""

import pytest

from aiwhispr_spark.operators.linking import snm_candidate_pairs
from aiwhispr_spark.operators.urlnorm import mobile_variant_clusters


def test_snm_window_pairs_and_typo_adjacency(spark):
    # typo'd key 'jonsen' sorts adjacent to 'jonson' — SNM pairs them where
    # token-hash blocking would not
    recs = spark.createDataFrame(
        [
            (1, "jonsen"),
            (2, "jonson"),
            (3, "smith"),
            (4, "smyth"),
            (5, "zzz"),
        ],
        "id long, key string",
    )
    out = snm_candidate_pairs(recs, key_col="key", window=2)
    pairs = {(r["id_a"], r["id_b"]) for r in out.collect()}
    # sorted order: jonsen(1) jonson(2) smith(3) smyth(4) zzz(5)
    assert pairs == {(1, 2), (2, 3), (3, 4), (4, 5)}


def test_snm_window_three_gaps(spark):
    recs = spark.createDataFrame(
        [(i, f"k{i}") for i in range(1, 5)], "id long, key string"
    )
    out = snm_candidate_pairs(recs, key_col="key", window=3).collect()
    gaps = {(r["id_a"], r["id_b"]): r["gap"] for r in out}
    assert gaps == {(1, 2): 1, (2, 3): 1, (3, 4): 1, (1, 3): 2, (2, 4): 2}
    with pytest.raises(ValueError, match="window"):
        snm_candidate_pairs(recs, key_col="key", window=1)


def _clusters(spark, urls):
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    return {r["variant_key"]: r for r in mobile_variant_clusters(df).collect()}


def test_variant_clusters_desktop_wins(spark):
    rows = _clusters(
        spark,
        [
            "https://site.org/a",
            "https://m.site.org/a",
            "https://www.site.org/a/amp",
            "https://site.org/a?amp=1",
            "https://site.org/a?amp=1&x=2",   # amp param dropped, x kept
        ],
    )
    c = rows["https://site.org/a"]
    assert (c["n_urls"], c["n_variant"]) == (4, 3)
    assert c["canonical_url"] == "https://site.org/a"
    # the x=2 url keys separately (real param differences must NOT collapse)
    c2 = rows["https://site.org/a?x=2"]
    assert c2["n_urls"] == 1 and c2["n_variant"] == 1


def test_variant_clusters_orphan_variant_elects_min(spark):
    rows = _clusters(
        spark, ["https://m.only.org/p", "https://amp.only.org/p"]
    )
    c = rows["https://only.org/p"]
    assert c["n_variant"] == 2
    # no desktop rendering ever seen: lexicographic min variant canonical
    assert c["canonical_url"] == "https://amp.only.org/p"


def test_variant_key_stacked_labels_and_inner_amp(spark):
    rows = _clusters(spark, ["https://www.m.site.org/amp/a"])
    # stacked labels strip; a LEADING /amp/ segment is outside the subset
    # (only the trailing segment is AMP-conventional) so it stays
    assert list(rows) == ["https://site.org/amp/a"]


def test_extract_links_rel_tokens_and_resolution(spark):
    from aiwhispr_spark.operators.linkgraph import extract_links_rel

    html = (
        '<html><body>'
        '<a href="https://a.org/x">plain</a>'
        '<a href="https://b.org/y" rel="nofollow">nf</a>'
        '<a rel="sponsored" href="https://c.org/z">sp</a>'
        '<a href="https://d.org/w" rel="me noopener">not-denial</a>'
        '<a href="https://e.org/v" data-rel="nofollow">cms-widget-attr</a>'
        '<a href="mailto:x@y.z" rel="nofollow">skipped</a>'
        "</body></html>"
    )
    docs = spark.createDataFrame(
        [("https://s.org/p", html.encode())], "url string, html binary"
    )
    out = {
        r["dst_url"]: r["nofollow"] for r in extract_links_rel(docs).collect()
    }
    assert out == {
        "https://a.org/x": 0,
        "https://b.org/y": 1,
        "https://c.org/z": 1,
        "https://d.org/w": 0,
        # data-rel is NOT a rel attribute — the edge stays an endorsement
        "https://e.org/v": 0,
    }
