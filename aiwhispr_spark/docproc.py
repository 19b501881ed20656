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
* docx/xlsx/pptx stay honestly stubbed (textract is not in this sandbox):
  registering them raises until a real extractor is plugged in.

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


_EXTRACTORS: dict[str, object] = {
    "txt": _extract_txt,
    "csv": _extract_txt,
    "html": _extract_html,
    "htm": _extract_html,
    "pdf": _extract_pdf_or_banner,
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
