"""CSV corpus source — the other interchange format corpora actually ship
in (metadata sidecars, label files, crawl manifests).

Spark-first: ``spark.read.csv`` with an EXPLICIT schema (inference is a full
extra pass at 100 TB), RFC 4180 quoting (``escape='"'`` so doubled quotes
work), and PERMISSIVE mode routing unparseable rows to ``_corrupt_record``
instead of failing the job.

Scale caveat, stated where users will hit it: ``multiLine=true`` (needed for
embedded newlines inside quoted fields) makes a CSV file NON-SPLITTABLE —
one file = one task, exactly like .jsonl.gz.  Corpora with multi-line fields
must ship as many small files (the dirs-of-files rule, sources/synthetic.py)
or re-encode newlines; single-line CSV stays splittable and needs neither.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

DOC_SCHEMA = "doc_id BIGINT, lang STRING, text STRING, _corrupt_record STRING"


def read_csv(
    spark: SparkSession,
    path: str,
    schema: str = DOC_SCHEMA,
    multi_line: bool = True,
) -> DataFrame:
    """Read a CSV corpus with an explicit schema; RFC 4180 quoting; bad rows
    survive as ``_corrupt_record`` (PERMISSIVE) rather than failing."""
    return (
        spark.read.schema(schema)
        .option("header", True)
        .option("multiLine", multi_line)
        .option("quote", '"')
        .option("escape", '"')  # RFC 4180 doubled-quote escaping
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .csv(path)
    )


def write_csv_fixture(path: str, n_docs: int = 300) -> str:
    """Deterministic CSV fixture: embedded commas, RFC 4180 doubled quotes,
    a newline inside a quoted field, unicode, and one row whose doc_id fails
    the BIGINT cast (must land in _corrupt_record / be skipped, never kill
    the read)."""
    import csv
    import os

    if os.path.exists(path):
        return path
    langs = ["en", "de", "fr", "es"]
    with open(path, "w", encoding="utf-8", newline="") as f:
        w = csv.writer(f, lineterminator="\n")
        w.writerow(["doc_id", "lang", "text"])
        for i in range(n_docs):
            w.writerow(
                [
                    i,
                    langs[i % 4],
                    f'csv doc {i}, says "quoted {i * 7}" and\n'
                    f"continues on a new line with café {i % 9}",
                ]
            )
        f.write('not-a-bigint,en,"malformed row"\n')
    return path
