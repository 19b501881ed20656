"""URL template induction + crawler-trap detection (operators/urlnorm.py::
mine_url_templates): segment classification precedence, trap-flag semantics
(parametric + many expansions, never static pages), host keying.  The
hash-value gate lives in __spark_entry__ (url_template_mining vs a
closed-form DuckDB oracle)."""

from __future__ import annotations

from pyspark.sql import functions as F

from aiwhispr_spark.operators.urlnorm import (
    mine_url_templates,
    path_template_expr,
)


def _templ(spark, paths):
    df = spark.createDataFrame([(p,) for p in paths], "p string")
    return [
        r.t for r in df.select(path_template_expr(F.col("p")).alias("t")).collect()
    ]


def test_segment_classification_precedence(spark):
    got = _templ(
        spark,
        [
            "/item/4711",  # digits -> {n}
            "/item/12345678",  # 8 digits: digits wins over hex
            "/blob/deadbeefcafe",  # hex-only len>=8 -> {hex}
            "/blob/deadbf",  # hex-only len<8: has no digit? d,e,a,d,b,f no
            "/cal/2020-05",  # mixed -> {mixed}
            "/About/Team",  # static segments lowercased
            "/",  # root
        ],
    )
    assert got == [
        "/item/{n}",
        "/item/{n}",
        "/blob/{hex}",
        "/blob/deadbf",
        "/cal/{mixed}",
        "/about/team",
        "/",
    ]


def test_trap_flag_requires_placeholder_and_expansion(spark):
    rows = [
        # 6 distinct expansions of /item/{n} on h0 -> trap at threshold 5
        *[(f"https://h0.example.org/item/{i}",) for i in range(6)],
        # static page fetched 10 times: many URLS, ONE path -> never a trap
        *[("https://h0.example.org/about",)] * 10,
        # parametric but only 2 expansions -> below threshold
        ("https://h1.example.org/item/1",),
        ("https://h1.example.org/item/2",),
    ]
    df = spark.createDataFrame(rows, "url string")
    got = {
        (r.host, r.template): (r.n_urls, r.n_paths, r.is_trap_i)
        for r in mine_url_templates(df, trap_min_paths=5).collect()
    }
    assert got == {
        ("h0.example.org", "/item/{n}"): (6, 6, 1),
        ("h0.example.org", "/about"): (10, 1, 0),
        ("h1.example.org", "/item/{n}"): (2, 2, 0),
    }
