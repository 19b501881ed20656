"""Native XML corpus source — Spark 4 ships the XML reader in core
(``spark.read.format("xml")``), so StackExchange-style attribute-row dumps
(the reference's S5 surface: ``aiwhisprStackExchangeDocProcessor`` walks
``<row Id=".." Body=".."/>`` elements) can ride the declarative scan
instead of the text-regex projection path (``f6_xml_attr_projection``
keeps byte-parity with the reference loop; THIS module is the
catalog-grade twin: typed schema, NULL-able missing attributes, column
pruning through the V2 scan).

Scale shape: XML is NOT splittable within a file (no sync markers), so a
corpus must ship as a DIR of many files — the same dirs-of-files rule as
parquet/ORC, but mandatory rather than advisory.  The explicit schema
matters twice at 100 TB: it kills the inference pre-scan (a full extra
pass over the corpus) and pins attribute types independent of row order.

DuckDB cannot read XML, so the gate is a ROUNDTRIP: a closed-form fixture
(id arithmetic; unicode, escaped quotes/ampersands/angles, a char-ref
newline — attribute-value normalization would eat a LITERAL newline, the
OOXML lesson, so the writer must emit &#10;) writes real XML files and
reads back; the oracle recomputes the decoded rows from arithmetic alone.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

ROW_SCHEMA = "_Id long, _Score long, _Lang string, _Body string"


def read_xml(
    spark: SparkSession,
    path: str,
    row_tag: str = "row",
    schema: str = ROW_SCHEMA,
) -> DataFrame:
    """Typed XML scan: explicit schema (no inference pass), attributes
    surfaced with the ``_`` prefix, absent attributes → NULL."""
    return (
        spark.read.format("xml").option("rowTag", row_tag).schema(schema).load(path)
    )


def _esc_attr(s: str) -> str:
    """XML attribute escaping that SURVIVES the parser's attribute-value
    normalization: literal newlines would normalize to spaces, so they are
    emitted as ``&#10;`` (char refs expand AFTER normalization)."""
    return (
        s.replace("&", "&amp;")
        .replace("<", "&lt;")
        .replace('"', "&quot;")
        .replace("\n", "&#10;")
    )


def fixture_row(i: int) -> tuple[int, str | None, str, int]:
    """Closed-form row ``(doc_id, lang, body, score)`` — mirrored by the
    DuckDB oracle from the same arithmetic."""
    body = f'xml éü中 {i} with "quotes" & <tags>\ntail {(i * i) % 89}'
    lang = None if i % 7 == 0 else ["en", "de", "fr", "es"][i % 4]
    return (i - 5, lang, body, (i * 3) % 23)


def write_xml_fixture(
    spark: SparkSession, path: str, n_docs: int = 300, n_files: int = 4
) -> str:
    """Idempotent dir of ``n_files`` real XML documents (root element per
    file, one ``<row .../>`` per record, contiguous id ranges per file —
    the mandatory many-files layout)."""
    done = os.path.join(path, "_SUCCESS")
    if os.path.exists(done):
        return path
    os.makedirs(path, exist_ok=True)
    per = (n_docs + n_files - 1) // n_files
    for f in range(n_files):
        lines = ['<?xml version="1.0" encoding="utf-8"?>', "<posts>"]
        for i in range(f * per, min((f + 1) * per, n_docs)):
            doc_id, lang, body, score = fixture_row(i)
            lang_attr = "" if lang is None else f' Lang="{lang}"'
            lines.append(
                f'  <row Id="{doc_id}" Score="{score}"{lang_attr}'
                f' Body="{_esc_attr(body)}" />'
            )
        lines.append("</posts>")
        with open(os.path.join(path, f"part-{f:04d}.xml"), "w", encoding="utf-8") as fh:
            fh.write("\n".join(lines))
    open(done, "w").close()
    return path
