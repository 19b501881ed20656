"""Web-corpus curation plan: the composed hygiene pass a crawl runs between
ingest (sources/warc.py) and everything downstream (KG construction,
training-data packing).

Stages, each individually oracle-gated by its own driver query (see
COVERAGE.md), composed here in the order the gates pin:

1. optional main-content extraction (operators/maincontent.py) — drop
   link-dense chrome blocks from the raw HTML;
2. T1 text extraction (the reference-byte-identical kernel UDF);
3. corpus-level line dedup (operators/linededup.py) — frequent-line
   boilerplate removal;
4. PII redaction (operators/pii.py);
5. exact-duplicate keeper election on the redacted text digest (min doc id
   wins — runs AFTER redaction so privacy-equivalent documents collapse).

The end-to-end composition is value-gated by `warc_curation_pipeline`
(__spark_entry__.py) against a five-stage DuckDB twin.

100 TB shape: stages 1-2 and 4 are narrow (one python stage for the T1
kernel, the rest JVM); the only corpus-wide exchanges are the line-count
shuffle (8-byte keys), the reassembly groupBy, and the keeper-election
groupBy on a 32-byte digest.  Nothing collects; nothing broadcasts a
corpus-sized table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from aiwhispr_spark.functions.udfs import clean_html_udf
from aiwhispr_spark.operators.linededup import drop_boilerplate_lines
from aiwhispr_spark.operators.maincontent import main_content_expr
from aiwhispr_spark.operators.pii import redact_pii_expr


def curate_corpus(
    docs: DataFrame,
    url_col: str = "url",
    html_col: str = "html",
    min_line_docs: int = 3,
    max_link_pct: int | None = None,
    redact: bool = True,
    dedup: bool = True,
) -> DataFrame:
    """(doc_id, text, n_lines_kept, n_lines_dropped) — one row per SURVIVING
    document; ``text`` is the cleaned, deduped, redacted content.

    ``max_link_pct=None`` skips main-content extraction (the fixture gate's
    configuration); pass a percentage to drop chrome blocks first."""
    html = F.decode(F.col(html_col), "UTF-8")
    if max_link_pct is not None:
        html = main_content_expr(html, max_link_pct=max_link_pct)
    cleaned = docs.select(
        F.col(url_col).alias("doc_id"), clean_html_udf(html).alias("text")
    )
    lined = drop_boilerplate_lines(cleaned, min_docs=min_line_docs)
    text = F.col("text_clean")
    if redact:
        text = redact_pii_expr(text)
    out = lined.select(
        "doc_id",
        text.alias("text"),
        F.col("n_kept").cast("long").alias("n_lines_kept"),
        F.col("n_dropped").cast("long").alias("n_lines_dropped"),
    )
    if not dedup:
        return out
    out = out.withColumn("_dg", F.md5("text"))
    keepers = out.groupBy("_dg").agg(F.min("doc_id").alias("doc_id"))
    return out.join(keepers, ["_dg", "doc_id"]).drop("_dg")
