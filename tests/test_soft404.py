"""Soft-404 detection (operators/maincontent.py::soft404_signals): the
marker∧short conjunction, long-article immunity, title-only markers.  The
hash-value gate lives in __spark_entry__ (soft404_detect vs the DuckDB
transform twin)."""

from __future__ import annotations

from aiwhispr_spark.operators.maincontent import soft404_signals


def _sig(spark, pages):
    df = spark.createDataFrame(
        [(u, h.encode()) for u, h in pages], "url string, html binary"
    )
    return {r.url: (r.has_marker_i, r.is_soft404_i) for r in soft404_signals(df).collect()}


def test_error_shell_flags_but_long_mention_does_not(spark):
    shell = "<html><title>Page Not Found</title><body>Sorry.</body></html>"
    article = (
        "<html><title>Why error 404 happens</title><body>"
        + "long analysis text " * 40
        + "</body></html>"
    )
    clean = "<html><title>Docs</title><body>hello world</body></html>"
    got = _sig(spark, [("a", shell), ("b", article), ("c", clean)])
    assert got == {"a": (1, 1), "b": (1, 0), "c": (0, 0)}


def test_body_marker_alone_is_enough_when_short(spark):
    page = "<html><title>Oops</title><body>This page does not exist.</body></html>"
    got = _sig(spark, [("a", page)])
    assert got["a"] == (1, 1)
