"""U5: document-type → extractor dispatch behind a pluggable registry.

The reference maps file suffixes to document-processor classes at
initializeDocumentProcessor.py:27-62 (txt/csv passthrough, pdf →
aiwhisprPdfDocProcessor.py:25-62 extracting per-page text with pypdf,
docx/xlsx/pptx → textract); the suffix table is
aiwhisprConstants.py:11-29.  This module is the engine's recast:

* ``register_extractor`` / ``extract_document`` — the same plug-point shape
  as ``multimodal.register_decoder``, so real libraries (pypdf, textract)
  drop in without touching the dataflow;
* a REAL minimal PDF text extractor for the common un-encrypted case
  (FlateDecode streams via stdlib zlib, text from Tj / ' / TJ show
  operators) — no third-party dependency;
* REAL docx/xlsx/pptx extractors (OOXML = ZIP of XML; stdlib zipfile +
  ElementTree — textract is absent, but these arms do the same text pull
  its backends do; semantics documented per function below).

Distribution: ``dispatch_extract_udf`` runs the registry inside an Arrow
batch (scalar pandas UDF) — per-suffix routing happens per row but library
setup amortizes per batch, the same shape as the reference's per-process
processor cache.
"""

from __future__ import annotations

import re
import zlib

import pandas as pd

# --- minimal PDF text extraction ----------------------------------------------------

# literal PDF string: ( ... ) with \-escapes and no unescaped nested parens.
# The escaped-char branch is \\[\s\S] (not \\.): an escape can precede an EOL
# (line continuation), and '.' would refuse the newline without DOTALL.
_PDF_STR = rb"\((?:\\[\s\S]|[^\\()])*\)"
# a text-showing op: (s) Tj | (s) ' | [ (a) -120 (b) ... ] TJ
_TJ = re.compile(_PDF_STR + rb"\s*(?:Tj|')")
_TJ_ARRAY = re.compile(rb"\[((?:" + _PDF_STR + rb"|[^\]\\(])*)\]\s*TJ", re.DOTALL)
_STREAM = re.compile(rb"stream\r?\n(.*?)endstream", re.DOTALL)

_ESCAPES = {
    0x6E: b"\n", 0x72: b"\r", 0x74: b"\t", 0x62: b"\b", 0x66: b"\f",
    0x28: b"(", 0x29: b")", 0x5C: b"\\",
}


def _unescape_pdf_string(tok: bytes) -> str:
    """'(...)' literal → text (handles \\n-style escapes and \\ooo octal;
    PDFDocEncoding ≈ latin-1 for the printable range)."""
    body = tok[1:-1]
    out = bytearray()
    i = 0
    while i < len(body):
        c = body[i]
        if c == 0x5C and i + 1 < len(body):
            n = body[i + 1]
            if n in _ESCAPES:
                out += _ESCAPES[n]
                i += 2
                continue
            if 0x30 <= n <= 0x37:  # octal, up to 3 digits
                j = i + 1
                digits = b""
                while j < len(body) and len(digits) < 3 and 0x30 <= body[j] <= 0x37:
                    digits += body[j : j + 1]
                    j += 1
                out.append(int(digits, 8) & 0xFF)
                i = j
                continue
            if n in (0x0A, 0x0D):
                # backslash-EOL line continuation: spec drops BOTH the
                # backslash and the EOL (CRLF counts as one EOL)
                i += 2
                if n == 0x0D and i < len(body) and body[i] == 0x0A:
                    i += 1
                continue
            i += 1  # lone backslash before other chars: swallowed (PDF spec)
            continue
        out.append(c)
        i += 1
    return out.decode("latin-1")


def _text_from_content(data: bytes) -> str:
    """Concatenate every shown string in a content stream, in stream order.
    Tj/' show one string; TJ shows each string element of its array (kerning
    numbers ignored, as pypdf does)."""
    shows: list[tuple[int, str]] = []
    for m in _TJ.finditer(data):
        shows.append((m.start(), _unescape_pdf_string(re.match(_PDF_STR, m.group()).group())))
    for m in _TJ_ARRAY.finditer(data):
        txt = "".join(_unescape_pdf_string(s.group()) for s in re.finditer(_PDF_STR, m.group(1)))
        shows.append((m.start(), txt))
    return "".join(t for _, t in sorted(shows))


def extract_pdf_text(payload: bytes) -> str:
    """Minimal un-encrypted-PDF text extraction (the reference's common case,
    aiwhisprPdfDocProcessor.py:25-62): scan every stream object, inflate
    FlateDecode bodies (raw bodies pass through), pull text-show operators.
    Streams (≈ pages for simple PDFs) join with '\\n' — mirroring the
    reference's per-page concat.  Raises ValueError on a non-PDF payload."""
    if payload[:5] != b"%PDF-":
        raise ValueError("not a PDF payload")
    parts = []
    for m in _STREAM.finditer(payload):
        data = m.group(1)
        # stream bodies end with an EOL before 'endstream'
        data = data.rstrip(b"\r\n")
        try:
            data = zlib.decompress(data)
        except zlib.error:
            pass  # uncompressed content stream (or an image we ignore)
        txt = _text_from_content(data)
        if txt:
            parts.append(txt)
    return "\n".join(parts)


# --- OOXML (docx / xlsx / pptx) extraction ------------------------------------------
#
# The reference routes all three through textract
# (aiwhisprMSWordDocProcessor.py:25-45, aiwhisprMSExcelDocProcessor.py,
# aiwhisprMSPptDocProcessor.py; suffix table aiwhisprConstants.py:11-29).
# textract is not in this sandbox, but OOXML files are ZIPs of XML — so these
# arms are REAL stdlib extractors (zipfile + ElementTree), the same spirit as
# the round-2 minimal PDF arm: no third-party dependency, honest documented
# semantics, golden + round-trip gated in tests/test_docproc.py.


def _tag(node) -> str:
    """Local tag name, namespace stripped ('{ns}t' → 't')."""
    return node.tag.rsplit("}", 1)[-1]


def extract_docx_text(payload: bytes) -> str:
    """word/document.xml → text.  Per paragraph (<w:p>): concatenate run
    texts (<w:t>, entity-decoded by ET), <w:tab/> → '\\t', <w:br/>/<w:cr/> →
    '\\n'; paragraphs join with '\\n' (textract's docx2txt arm uses the same
    paragraph-per-line shape).  Raises on a non-zip payload."""
    import io
    import zipfile
    from xml.etree import ElementTree as ET

    with zipfile.ZipFile(io.BytesIO(payload)) as zf:
        root = ET.fromstring(zf.read("word/document.xml"))
    paras = []
    for p in root.iter():
        if _tag(p) != "p":
            continue
        parts = []
        for node in p.iter():
            t = _tag(node)
            if t == "t":
                parts.append(node.text or "")
            elif t == "tab":
                parts.append("\t")
            elif t in ("br", "cr"):
                parts.append("\n")
        paras.append("".join(parts))
    return "\n".join(paras)


def extract_xlsx_text(payload: bytes) -> str:
    """xl/sharedStrings.xml → one line per shared string (<si>; rich-text
    runs concatenate).  Cell-level numerics live in the sheet XML, not the
    string table — skipped, matching textract's string-focused output.
    A workbook with no sharedStrings part yields ''."""
    import io
    import zipfile
    from xml.etree import ElementTree as ET

    with zipfile.ZipFile(io.BytesIO(payload)) as zf:
        if "xl/sharedStrings.xml" not in zf.namelist():
            return ""
        root = ET.fromstring(zf.read("xl/sharedStrings.xml"))
    lines = []
    for si in root:
        if _tag(si) == "si":
            lines.append("".join(n.text or "" for n in si.iter() if _tag(n) == "t"))
    return "\n".join(lines)


def extract_pptx_text(payload: bytes) -> str:
    """ppt/slides/slide<N>.xml in slide-number order → text: per text
    paragraph (<a:p>) concatenate runs (<a:t>), paragraphs and slides join
    with '\\n'."""
    import io
    import zipfile
    from xml.etree import ElementTree as ET

    with zipfile.ZipFile(io.BytesIO(payload)) as zf:
        names = sorted(
            (n for n in zf.namelist() if re.fullmatch(r"ppt/slides/slide\d+\.xml", n)),
            key=lambda n: int(re.search(r"\d+", n).group()),
        )
        slides = [ET.fromstring(zf.read(n)) for n in names]
    out = []
    for root in slides:
        for p in root.iter():
            if _tag(p) == "p":
                out.append("".join(n.text or "" for n in p.iter() if _tag(n) == "t"))
    return "\n".join(out)


# fixture builders: the round-trip contract (build(text) → extract → text) is
# what u5_doc_dispatch hash-gates end-to-end; fixed zip timestamps keep the
# payloads byte-deterministic.
_W = "http://schemas.openxmlformats.org/wordprocessingml/2006/main"
_A = "http://schemas.openxmlformats.org/drawingml/2006/main"


_XML_INVALID = re.compile("[\x00-\x08\x0b\x0c\x0e-\x1f]")


def _xml_safe(text: str) -> str:
    """Embed arbitrary text in XML content with a lossless-as-possible
    round trip: XML-1.0-INVALID control chars are STRIPPED (they cannot be
    represented, even as character references), and '\\r' is emitted as
    ``&#13;`` — parsers normalize a literal CR to LF before parsing, but
    character references expand after normalization, so the CR survives
    extraction byte-exactly."""
    from xml.sax.saxutils import escape

    return escape(_XML_INVALID.sub("", text)).replace("\r", "&#13;")


def _zip_of(parts: dict[str, str]) -> bytes:
    import io
    import zipfile

    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as zf:
        for name, body in parts.items():
            zf.writestr(zipfile.ZipInfo(name, (1980, 1, 1, 0, 0, 0)), body)
    return buf.getvalue()


def build_minimal_docx(text: str) -> bytes:
    body = "".join(
        f'<w:p><w:r><w:t xml:space="preserve">{_xml_safe(p)}</w:t></w:r></w:p>'
        for p in text.split("\n")
    )
    doc = f'<w:document xmlns:w="{_W}"><w:body>{body}</w:body></w:document>'
    return _zip_of({"word/document.xml": doc})


def build_minimal_xlsx(text: str) -> bytes:
    sis = "".join(
        f'<si><t xml:space="preserve">{_xml_safe(line)}</t></si>' for line in text.split("\n")
    )
    sst = f'<sst xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">{sis}</sst>'
    return _zip_of({"xl/sharedStrings.xml": sst})


def build_minimal_pptx(text: str) -> bytes:
    paras = "".join(
        f'<a:p><a:r><a:t>{_xml_safe(p)}</a:t></a:r></a:p>' for p in text.split("\n")
    )
    slide = (
        f'<p:sld xmlns:p="http://schemas.openxmlformats.org/presentationml/2006/main" '
        f'xmlns:a="{_A}"><p:txBody>{paras}</p:txBody></p:sld>'
    )
    return _zip_of({"ppt/slides/slide1.xml": slide})


# --- registry -----------------------------------------------------------------------


def _extract_txt(payload: bytes) -> str:
    return payload.decode("utf-8", errors="replace")


def _extract_html(payload: bytes) -> str:
    from . import kernels

    return kernels.clean_html(payload.decode("utf-8", errors="replace"))


def _extract_pdf_or_banner(payload: bytes) -> str:
    """Real extraction for real PDFs; the reference-shaped '[PDF]' banner for
    payloads that are not PDFs (keeps dispatch total — a corrupt or
    mislabelled file degrades instead of failing the batch)."""
    try:
        return extract_pdf_text(payload)
    except Exception:
        return "[PDF]" + payload.decode("utf-8", errors="replace")[:40]


def _office_or_banner(extract, banner: str):
    """Same degrade-don't-fail shape as the PDF arm: real extraction for real
    OOXML zips, a typed banner for corrupt/mislabelled payloads."""

    def fn(payload: bytes) -> str:
        try:
            return extract(payload)
        except Exception:
            return banner + payload.decode("utf-8", errors="replace")[:40]

    return fn


_EXTRACTORS: dict[str, object] = {
    "txt": _extract_txt,
    "csv": _extract_txt,
    "html": _extract_html,
    "htm": _extract_html,
    "pdf": _extract_pdf_or_banner,
    "docx": _office_or_banner(extract_docx_text, "[DOCX]"),
    "xlsx": _office_or_banner(extract_xlsx_text, "[XLSX]"),
    "pptx": _office_or_banner(extract_pptx_text, "[PPTX]"),
}


def register_extractor(suffix: str, fn) -> None:
    """Plug in a real extractor: fn(payload: bytes) -> str.  E.g.
    ``register_extractor('docx', textract_docx)`` once textract exists."""
    _EXTRACTORS[suffix.lower()] = fn


def get_extractor(suffix: str):
    return _EXTRACTORS.get(suffix.lower())


def extract_document(suffix: str, payload: bytes) -> str:
    """Route payload through the suffix's extractor (reference's
    initializeDocumentProcessor dispatch).  Unknown suffixes fall back to
    utf-8 text — the reference indexes unknown types as plain text."""
    fn = _EXTRACTORS.get((suffix or "").lower(), _extract_txt)
    return fn(payload if payload is not None else b"")


def office_payload_udf():
    """Arrow-batched fixture builder: (suffix, text) → a minimal OOXML zip OF
    that text for docx/xlsx/pptx rows, b'' otherwise (python UDFs are hoisted
    out of ``when()`` branches and evaluated on every row, so the non-office
    arm must not reach a builder).  Used by the u5_doc_dispatch gate: build →
    dispatch-extract must round-trip the text byte-exactly."""
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import BinaryType

    builders = {"docx": build_minimal_docx, "xlsx": build_minimal_xlsx,
                "pptx": build_minimal_pptx}

    @pandas_udf(BinaryType())
    def _udf(suffix: pd.Series, text: pd.Series) -> pd.Series:
        # (t or ""): a NULL text row must degrade to an empty document, not
        # crash the task (the corpus schema allows text=None)
        return pd.Series(
            [builders[s](t or "") if s in builders else b"" for s, t in zip(suffix, text)]
        )

    return _udf


def dispatch_extract_udf(extractors: dict | None = None):
    """Arrow-batched dispatch UDF: (suffix, payload) → extracted text.
    An explicit `extractors` dict ships in the closure (driver-side
    registrations are otherwise invisible to python workers)."""
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import StringType

    table = dict(_EXTRACTORS if extractors is None else extractors)

    @pandas_udf(StringType())
    def _udf(suffix: pd.Series, payload: pd.Series) -> pd.Series:
        out = []
        for sfx, pay in zip(suffix, payload):
            fn = table.get((sfx or "").lower(), _extract_txt)
            b = bytes(pay) if pay is not None else b""
            out.append(fn(b))
        return pd.Series(out)

    return _udf
