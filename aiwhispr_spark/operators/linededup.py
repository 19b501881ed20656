"""CCNet-style line-level corpus deduplication: drop lines whose normalized
form appears in ≥ ``min_docs`` distinct documents (navigation chrome, cookie
banners, boilerplate paragraphs), then reassemble each document's surviving
lines in order.

This is corpus-level (cross-document) — distinct from the per-document
``dup_line_frac`` repetition signal in operators/textstats.py, which never
leaves the row.  The reference has no corpus-level text hygiene (it indexes
each file independently); this operator is part of the training-data-pipeline
tier the engine adds on top.

100 TB shape
------------
* The only corpus-wide exchange carries ``(line_hash, doc_id)`` pairs — the
  line TEXT itself never rides the counting shuffle (hash + count only).
* The frequent-line set (lines in ≥ min_docs docs) is a tiny fraction of all
  lines at any threshold worth using, but it is NOT assumed
  broadcast-small: the flagging join keys on the 8-byte hash, so AQE picks
  broadcast when it fits and a shuffled hash join otherwise.
* Reassembly groups by doc_id — each group is one document's lines, bounded
  by document size, so the ``collect_list`` per group is bounded regardless
  of corpus size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _norm(col):
    # normalization under which two lines count as "the same line":
    # case-insensitive, surrounding-space-insensitive.  Mirrored verbatim in
    # the DuckDB oracle (lower(trim(...))).
    return F.lower(F.trim(col))


def frequent_lines(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_docs: int = 2,
    sep: str = "\n",
) -> DataFrame:
    """(line_key, n_docs) for every normalized non-empty unit occurring in at
    least ``min_docs`` distinct documents.  ``line_key = xxhash64(norm)`` —
    the 8-byte key is what downstream joins carry.  ``sep`` picks the dedup
    unit: "\n" = lines (CCNet), "\n\n" = paragraphs (Dolma)."""
    lines = docs.select(
        F.col(id_col).alias("_id"),
        F.explode(F.split(F.coalesce(F.col(text_col), F.lit("")), sep)).alias("line"),
    )
    return (
        lines.select(F.xxhash64(_norm(F.col("line"))).alias("line_key"), "_id")
        .where(_norm(F.col("line")) != "")
        .groupBy("line_key")
        .agg(F.countDistinct("_id").alias("n_docs"))
        .where(F.col("n_docs") >= min_docs)
    )


def drop_boilerplate_lines(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_docs: int = 2,
    sep: str = "\n",
) -> DataFrame:
    """Return one row per input document with:

    * ``text_clean`` — the document with every frequent line removed,
      remaining lines rejoined with ``\\n`` in original order;
    * ``n_kept`` / ``n_dropped`` — line counts.

    Empty/whitespace-only lines are structural, not boilerplate: they are
    never counted and never dropped.  NULL text (an upstream extraction
    failure) is treated as '' — the document survives with one empty kept
    line rather than silently vanishing from the corpus.

    ``sep`` selects the dedup unit ("\\n" lines / "\\n\\n" paragraphs) and is
    used both as the split pattern (regex — the two supported values are
    regex-literal) and the rejoin separator."""
    freq = frequent_lines(docs, text_col, id_col, min_docs, sep).select("line_key")
    lines = docs.select(
        F.col(id_col).alias("_id"),
        F.posexplode(F.split(F.coalesce(F.col(text_col), F.lit("")), sep)).alias(
            "ord", "line"
        ),
    ).withColumn(
        "line_key",
        F.when(_norm(F.col("line")) != "", F.xxhash64(_norm(F.col("line")))),
    )
    flagged = lines.join(
        freq.withColumn("is_dup", F.lit(True)), on="line_key", how="left"
    ).withColumn("is_dup", F.coalesce("is_dup", F.lit(False)))
    kept_struct = F.when(
        ~F.col("is_dup"), F.struct(F.col("ord"), F.col("line"))
    )
    return (
        flagged.groupBy("_id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(kept_struct)), lambda s: s["line"]
                ),
                sep,
            ).alias("text_clean"),
            F.sum(F.when(F.col("is_dup"), 0).otherwise(1)).alias("n_kept"),
            F.sum(F.when(F.col("is_dup"), 1).otherwise(0)).alias("n_dropped"),
        )
        .withColumnRenamed("_id", id_col)
    )
