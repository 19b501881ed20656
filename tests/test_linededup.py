"""Corpus-level line dedup gates (operators/linededup.py). The sf-scale value
gate (vs a DuckDB twin over the simple corpus) is `line_dedup_boilerplate` in
__spark_entry__.py; these pin the semantics on hand-built docs."""

from aiwhispr_spark.operators.linededup import drop_boilerplate_lines, frequent_lines

DOCS = [
    ("d1", "Accept cookies\nalpha one\n\nbeta two\nAccept cookies"),
    ("d2", "  accept COOKIES  \ngamma three"),
    ("d3", "delta four\nAccept cookies\nepsilon five"),
    ("d4", "zeta six only"),
]


def _df(spark):
    return spark.createDataFrame(DOCS, "doc_id string, text string")


def test_frequent_lines_normalizes_case_and_trim(spark):
    freq = frequent_lines(_df(spark), min_docs=3)
    rows = freq.collect()
    assert len(rows) == 1 and rows[0].n_docs == 3  # cookie banner, d1+d2+d3


def test_drop_preserves_order_and_blank_lines(spark):
    out = {
        r.doc_id: r for r in drop_boilerplate_lines(_df(spark), min_docs=3).collect()
    }
    # d1: both banner copies dropped (within-doc repeat counts once for the
    # doc-frequency but every occurrence is removed); blank line survives
    assert out["d1"].text_clean == "alpha one\n\nbeta two"
    assert out["d1"].n_dropped == 2 and out["d1"].n_kept == 3
    assert out["d2"].text_clean == "gamma three"
    assert out["d3"].text_clean == "delta four\nepsilon five"
    assert out["d4"].text_clean == "zeta six only"
    assert out["d4"].n_dropped == 0


def test_threshold_two_also_drops_nothing_unique(spark):
    out = {
        r.doc_id: r.text_clean
        for r in drop_boilerplate_lines(_df(spark), min_docs=2).collect()
    }
    # still only the banner crosses min_docs=2; unique content untouched
    assert out["d4"] == "zeta six only"
    assert out["d1"] == "alpha one\n\nbeta two"


def test_doc_of_only_boilerplate_becomes_empty(spark):
    docs = _df(spark).union(
        _df(spark).sparkSession.createDataFrame(
            [("d5", "Accept cookies")], "doc_id string, text string"
        )
    )
    out = {r.doc_id: r for r in drop_boilerplate_lines(docs, min_docs=3).collect()}
    assert out["d5"].text_clean == "" and out["d5"].n_kept == 0


def test_paragraph_unit_sep(spark):
    """sep='\\n\\n' dedups PARAGRAPHS: a multi-line paragraph counts as one
    unit (its inner newlines survive reassembly)."""
    from aiwhispr_spark.operators.linededup import drop_boilerplate_lines

    chrome = "cookie banner line one\nline two of the banner"
    df = spark.createDataFrame(
        [
            (1, chrome + "\n\n" + "unique body A"),
            (2, chrome + "\n\n" + "unique body B"),
            (3, "unique body C\n\nwith a second para"),
        ],
        "doc_id long, text string",
    )
    rows = {
        r["doc_id"]: r
        for r in drop_boilerplate_lines(df, min_docs=2, sep="\n\n").collect()
    }
    assert rows[1]["text_clean"] == "unique body A"
    assert rows[2]["text_clean"] == "unique body B"
    assert rows[1]["n_dropped"] == 1
    # line-level dedup would have dropped the banner lines individually;
    # paragraph-level keeps doc 3 fully intact including its inner structure
    assert rows[3]["text_clean"] == "unique body C\n\nwith a second para"
    assert rows[3]["n_dropped"] == 0
