"""U5 dispatch + minimal PDF extractor goldens.

The PDF fixture is constructed programmatically (no binary blobs in the
repo): a syntactically-real PDF with FlateDecode content streams, text shown
via Tj, ', and TJ-array operators, escapes and octal codes included —
the un-encrypted common case the reference handles via pypdf
(aiwhisprPdfDocProcessor.py:25-62).
"""

from __future__ import annotations

import zlib

from aiwhispr_spark.docproc import (
    dispatch_extract_udf,
    extract_document,
    extract_pdf_text,
    get_extractor,
    register_extractor,
)


def _pdf_with_streams(contents: list[bytes], compress: bool = True) -> bytes:
    out = [b"%PDF-1.4\n"]
    out.append(b"1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n")
    out.append(b"2 0 obj << /Type /Pages /Count 1 /Kids [3 0 R] >> endobj\n")
    out.append(b"3 0 obj << /Type /Page /Parent 2 0 R /Contents 4 0 R >> endobj\n")
    for i, c in enumerate(contents):
        body = zlib.compress(c) if compress else c
        filt = b" /Filter /FlateDecode" if compress else b""
        out.append(
            b"%d 0 obj << /Length %d%s >> stream\n" % (4 + i, len(body), filt)
            + body
            + b"\nendstream endobj\n"
        )
    out.append(b"%%EOF\n")
    return b"".join(out)


PAGE1 = b"BT /F1 12 Tf 72 720 Td (Hello PDF) Tj 0 -14 Td [(World)(!) -250 (again)] TJ ET"
PAGE2 = b"BT (Second\\npage with \\(parens\\) and \\101 octal) ' ET"


def test_extract_pdf_text_golden_flate():
    pdf = _pdf_with_streams([PAGE1, PAGE2])
    assert extract_pdf_text(pdf) == "Hello PDFWorld!again\nSecond\npage with (parens) and A octal"


def test_extract_pdf_text_uncompressed_stream():
    pdf = _pdf_with_streams([PAGE1], compress=False)
    assert extract_pdf_text(pdf) == "Hello PDFWorld!again"


def test_extract_pdf_text_backslash_eol_continuation():
    """\\<EOL> inside a literal is a line continuation: BOTH the backslash
    and the EOL drop (CRLF counts as one EOL) — common writer output for
    wrapped long strings."""
    page = b"BT (long\\\nstring) Tj (a\\\r\nb) Tj ET"
    pdf = _pdf_with_streams([page])
    assert extract_pdf_text(pdf) == "longstringab"


def test_extract_document_dispatch_routes_pdf():
    pdf = _pdf_with_streams([PAGE1])
    assert extract_document("pdf", pdf) == "Hello PDFWorld!again"
    assert extract_document("PDF", pdf) == "Hello PDFWorld!again"  # case-fold
    # non-PDF payload under the pdf suffix degrades to the banner, not a crash
    assert extract_document("pdf", b"just words here") == "[PDF]just words here"
    # txt passthrough; html runs the T1 regex; unknown suffix → plain text
    assert extract_document("txt", b"plain") == "plain"
    assert extract_document("html", b"<p>x &amp; y</p>") == "x  y"
    assert extract_document("log", b"fallback") == "fallback"


def test_register_extractor_plugs_in():
    # a suffix with no built-in arm, so teardown can simply delete it
    register_extractor("wpd", lambda b: "WPD:" + b.decode())
    try:
        assert extract_document("wpd", b"zzz") == "WPD:zzz"
        assert get_extractor("wpd") is not None
    finally:
        import aiwhispr_spark.docproc as dp

        del dp._EXTRACTORS["wpd"]


def test_dispatch_udf_routes_all_arms(spark):
    from pyspark.sql import functions as F

    pdf = _pdf_with_streams([PAGE1])
    rows = [("a", "txt", b"plain text"), ("b", "html", b"<p>hi</p>"), ("c", "pdf", bytes(pdf))]
    df = spark.createDataFrame(rows, "id string, suffix string, payload binary")
    out = {
        r["id"]: r["extracted"]
        for r in df.select(
            "id", dispatch_extract_udf()(F.col("suffix"), F.col("payload")).alias("extracted")
        ).collect()
    }
    assert out == {"a": "plain text", "b": "hi", "c": "Hello PDFWorld!again"}


# --- OOXML arms (round 3: VERDICT r2 #4 — real docx/xlsx/pptx extractors) ----


def test_docx_golden_tab_br_runs():
    from aiwhispr_spark.docproc import _zip_of, extract_docx_text

    doc = (
        '<w:document xmlns:w="http://schemas.openxmlformats.org/wordprocessingml/2006/main">'
        "<w:body>"
        "<w:p><w:r><w:t>a</w:t><w:tab/><w:t>b</w:t><w:br/><w:t>c</w:t></w:r></w:p>"
        '<w:p><w:r><w:t xml:space="preserve"> two  spaced </w:t></w:r></w:p>'
        "</w:body></w:document>"
    )
    assert extract_docx_text(_zip_of({"word/document.xml": doc})) == "a\tb\nc\n two  spaced "


def test_xlsx_golden_rich_runs_and_missing_sst():
    from aiwhispr_spark.docproc import _zip_of, extract_xlsx_text

    sst = (
        '<sst xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">'
        "<si><r><t>a</t></r><r><t>b</t></r></si><si><t>c &amp; d</t></si></sst>"
    )
    assert extract_xlsx_text(_zip_of({"xl/sharedStrings.xml": sst})) == "ab\nc & d"
    # workbook with no string table (numerics only) → empty text, not a crash
    assert extract_xlsx_text(_zip_of({"xl/workbook.xml": "<x/>"})) == ""


def test_pptx_golden_numeric_slide_order():
    from aiwhispr_spark.docproc import _zip_of, extract_pptx_text

    def slide(txt):
        return (
            '<p:sld xmlns:p="http://schemas.openxmlformats.org/presentationml/2006/main" '
            'xmlns:a="http://schemas.openxmlformats.org/drawingml/2006/main">'
            f"<p:txBody><a:p><a:r><a:t>{txt}</a:t></a:r></a:p></p:txBody></p:sld>"
        )

    payload = _zip_of(
        {"ppt/slides/slide10.xml": slide("ten"), "ppt/slides/slide2.xml": slide("two")}
    )
    # numeric order (2 before 10), not lexicographic
    assert extract_pptx_text(payload) == "two\nten"


def test_office_roundtrip_and_banner_fallback():
    from aiwhispr_spark.docproc import (
        build_minimal_docx,
        build_minimal_pptx,
        build_minimal_xlsx,
        extract_docx_text,
        extract_pptx_text,
        extract_xlsx_text,
    )

    texts = [
        "hello world",
        "multi\nline  with  spaces",
        "entities <a> & \"q\" 'x'",
        "",
        "carriage\rreturn and\ttab",  # CR survives via &#13; (parsers
        # normalize a LITERAL \r to \n, but char references expand after
        # normalization)
    ]
    for t in texts:
        assert extract_docx_text(build_minimal_docx(t)) == t
        assert extract_xlsx_text(build_minimal_xlsx(t)) == t
        assert extract_pptx_text(build_minimal_pptx(t)) == t
    # XML-1.0-invalid control chars cannot be represented → stripped, the
    # documented (and oracle-mirrored) degradation
    assert extract_docx_text(build_minimal_docx("a\x03b")) == "ab"
    assert extract_xlsx_text(build_minimal_xlsx("a\x00b")) == "ab"
    assert extract_pptx_text(build_minimal_pptx("a\x1fb")) == "ab"
    # corrupt payloads degrade to the typed banner (dispatch stays total)
    assert extract_document("docx", b"not a zip").startswith("[DOCX]")
    assert extract_document("xlsx", b"junk").startswith("[XLSX]")
    assert extract_document("pptx", b"junk").startswith("[PPTX]")
    # builders are byte-deterministic (fixed zip timestamps)
    assert build_minimal_docx("x") == build_minimal_docx("x")
