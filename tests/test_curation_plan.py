"""plans/curation.py unit gates; the end-to-end value gate is
`warc_curation_pipeline` (vs the five-stage DuckDB twin)."""

from aiwhispr_spark.plans.curation import curate_corpus

PAGES = [
    # three docs share a boilerplate line (min_line_docs=3 drops it)
    ("https://a.org/1", "<p>unique alpha text one</p>\n<p>Cookie banner</p>"),
    ("https://a.org/2", "<p>unique beta text two</p>\n<p>Cookie banner</p>"),
    ("https://a.org/3", "<p>unique gamma text three</p>\n<p>Cookie banner</p>"),
    # two exact duplicates (post-clean) → one keeper (min url)
    ("https://b.org/x", "<p>same body</p>"),
    ("https://a.org/9", "<p>same body</p>"),
    # PII page
    ("https://c.org/p", "<p>write to me@ex.org now</p>"),
]


def _df(spark, pages=PAGES):
    return spark.createDataFrame(
        [(u, h.encode()) for u, h in pages], "url string, html binary"
    )


def test_full_composition(spark):
    rows = {r.doc_id: r for r in curate_corpus(_df(spark)).collect()}
    assert set(rows) == {
        "https://a.org/1",
        "https://a.org/2",
        "https://a.org/3",
        "https://a.org/9",  # min-url keeper; b.org/x deduped away
        "https://c.org/p",
    }
    assert "Cookie banner" not in rows["https://a.org/1"].text
    assert rows["https://a.org/1"].n_lines_dropped == 1
    assert "<EMAIL>" in rows["https://c.org/p"].text


def test_dedup_and_redact_are_optional(spark):
    out = curate_corpus(_df(spark), redact=False, dedup=False)
    rows = {r.doc_id: r.text for r in out.collect()}
    assert len(rows) == 6  # both duplicates survive
    assert "me@ex.org" in rows["https://c.org/p"]


def test_main_content_stage_composes(spark):
    pages = [
        (
            "https://d.org/n",
            "<p>prose paragraph with plenty of words beyond links</p>\n"
            '<p><a href="/a">Nav</a> <a href="/b">Bar</a></p>',
        )
    ]
    out = curate_corpus(_df(spark, pages), max_link_pct=50, dedup=False)
    row = out.first()
    assert "prose paragraph" in row.text and "Nav" not in row.text
