"""JSONL (newline-delimited JSON) corpus source — the interchange format of
most public text-corpus releases (Dolma, RedPajama, FineWeb dumps ship as
.jsonl/.jsonl.gz shards).

Spark-first: ``spark.read.schema(...).json`` — an EXPLICIT schema is
mandatory on the 100 TB path because schema inference is a full extra pass
over the data, and a drifting inferred schema silently poisons downstream
plans.  Malformed lines land in ``_corrupt_record`` (PERMISSIVE) instead of
killing the job; count them as an ingest metric.

.jsonl.gz caveat at scale: gzip is NOT splittable — one file = one task, so
corpora must ship as many shards (the same dirs-of-files rule as parquet,
sources/synthetic.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

DOC_SCHEMA = (
    "doc_id BIGINT, lang STRING, text STRING, _corrupt_record STRING"
)


def read_jsonl(
    spark: SparkSession, path: str, schema: str = DOC_SCHEMA
) -> DataFrame:
    """Read a JSONL corpus with an explicit schema (PERMISSIVE mode: bad
    lines survive as ``_corrupt_record`` rows rather than failing the job)."""
    return (
        spark.read.schema(schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .json(path)
    )


def write_jsonl_fixture(path: str, n_docs: int = 300) -> str:
    """Deterministic JSONL fixture: unicode, embedded quotes/newlines, and
    one malformed line to exercise PERMISSIVE parsing."""
    import json
    import os

    if os.path.exists(path):
        return path
    langs = ["en", "de", "fr", "es"]
    with open(path, "w", encoding="utf-8") as f:
        for i in range(n_docs):
            rec = {
                "doc_id": i,
                "lang": langs[i % 4],
                "text": (
                    f'json document {i} says "quoted {i * 7}" and\n'
                    f"continues with café number {i % 9}"
                ),
            }
            f.write(json.dumps(rec, ensure_ascii=True) + "\n")
        f.write('{"doc_id": broken-not-json\n')
    return path
