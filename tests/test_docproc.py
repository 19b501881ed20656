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
    register_extractor("docx", lambda b: "DOCX:" + b.decode())
    try:
        assert extract_document("docx", b"zzz") == "DOCX:zzz"
        assert get_extractor("docx") is not None
    finally:
        import aiwhispr_spark.docproc as dp

        del dp._EXTRACTORS["docx"]


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
