"""ORC corpus source/sink — the second Spark-native columnar format next to
parquet (Hive-ecosystem corpora and older warehouse exports ship as ORC;
an engine that claims "point it at your existing tables" needs the reader).

Spark-first: ``spark.read.orc`` / ``df.write.orc`` ride the same columnar
scan machinery as parquet — predicate pushdown into stripe/row-group
indexes, column pruning via ReadSchema, splittable stripes so a dir of ORC
files parallelizes exactly like the parquet dirs-of-files rule
(sources/synthetic.py).  Nothing here is python-side: the format is a
DataSource V1 scan, fully whole-stage-codegen'd.

100 TB shape: identical to the parquet path — ORC stripes are the split
unit, so corpora must ship as many files (one giant single-stripe file
serializes the scan, same trap as single-row-group parquet).  Writes use
``partitionBy`` for the same partition-pruning layout the parquet sink
gets.

DuckDB cannot read ORC, so the correctness gate is a ROUNDTRIP: a
closed-form frame (doc_id arithmetic) writes to ORC and reads back; the
oracle recomputes the same rows from the arithmetic alone — any write/read
corruption (type mangling, unicode damage, row loss) breaks the value
hash.  Reference parity: aiwhispr's content-site config points the indexer
at existing file trees (`python/configs` in prasaar/aiwhispr); ORC is one
of the trees a warehouse user actually has.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    """Read an ORC corpus (schema comes from the ORC footer — unlike text
    formats there is no inference pass to avoid; the footer IS the schema)."""
    return spark.read.orc(path)


def write_orc(df: DataFrame, path: str, n_files: int = 4) -> str:
    """Write ``df`` as a dir of ``n_files`` ORC files (splittable layout)."""
    df.repartition(n_files).write.mode("overwrite").orc(path)
    return path


def fixture_frame(spark: SparkSession, n_docs: int = 300) -> DataFrame:
    """Closed-form corpus the roundtrip gate writes: unicode text with
    embedded quotes/newlines, a NULL lang every 7th row, and a negative id
    row — the values an ORC writer could plausibly mangle."""
    i = F.col("id")
    s = i.cast("string")
    return spark.range(n_docs).select(
        (i - 5).alias("doc_id"),
        F.when(i % 7 != 0, F.element_at(
            F.array(F.lit("en"), F.lit("de"), F.lit("fr"), F.lit("es")),
            (i % 4 + 1).cast("int"),
        )).alias("lang"),
        F.concat(
            F.lit("doc éü中 "), s,
            F.lit(' with "quotes" and\nnewline tail '), (i * i % 97).cast("string"),
        ).alias("text"),
        (i % 13).cast("double").alias("score"),
    )


def write_orc_fixture(spark: SparkSession, path: str, n_docs: int = 300) -> str:
    """Idempotent ORC fixture dir (same discipline as the CSV/JSONL fixtures)."""
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        write_orc(fixture_frame(spark, n_docs), path)
    return path
