"""schema.org microdata mining (operators/structured.py::microdata_triples):
scope/property shapes, content-attr precedence, nameless-scope drop, plan
purity.  The hash-value gate lives in __spark_entry__ (microdata_triples vs
a closed-form DuckDB oracle)."""

from __future__ import annotations

from aiwhispr_spark.operators.structured import microdata_triples


def _docs(spark, rows):
    return spark.createDataFrame(
        [(u, h.encode("utf-8")) for u, h in rows], "url string, html binary"
    )


def _mine(spark, html):
    rows = microdata_triples(_docs(spark, [("u1", html)])).collect()
    return {(r.subj, r.pred, r.obj, r.itype) for r in rows}


def test_person_scope_with_text_and_content_values(spark):
    html = (
        '<div itemscope itemtype="https://schema.org/Person">'
        '<span itemprop="name">Ada Byron</span>'
        '<span itemprop="jobTitle">Engineer</span>'
        '<meta itemprop="birthDate" content="1815-12-10">'
        "</div>"
    )
    assert _mine(spark, html) == {
        ("Ada Byron", "jobTitle", "Engineer", "Person"),
        ("Ada Byron", "birthDate", "1815-12-10", "Person"),
    }


def test_multiple_scopes_and_nameless_scope_dropped(spark):
    html = (
        '<div itemscope itemtype="https://schema.org/Organization">'
        '<span itemprop="name">Acme</span><span itemprop="location">Berlin</span></div>'
        '<div itemscope itemtype="https://schema.org/Thing">'
        '<span itemprop="label">orphan</span></div>'
    )
    assert _mine(spark, html) == {("Acme", "location", "Berlin", "Organization")}


def test_itype_is_last_path_segment(spark):
    html = (
        '<section itemscope itemtype="http://schema.org/LocalBusiness">'
        '<span itemprop="name">Cafe</span><span itemprop="telephone">12345</span>'
        "</section>"
    )
    got = _mine(spark, html)
    assert got == {("Cafe", "telephone", "12345", "LocalBusiness")}


def test_plain_divs_without_itemscope_ignored(spark):
    html = '<div class="x"><span itemprop="name">Decoy</span></div>'
    assert _mine(spark, html) == set()


def test_empty_values_dropped(spark):
    html = (
        '<div itemscope itemtype="https://schema.org/Person">'
        '<span itemprop="name">Ada</span><span itemprop="jobTitle"></span></div>'
    )
    assert _mine(spark, html) == set()


def test_no_python_stage_in_plan(spark):
    df = microdata_triples(_docs(spark, [("u1", "<html></html>")]))
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan and "Arrow" not in plan
