"""Extractive passage summarization (Luhn '58 family): score fixed-size
token passages by the document-level term frequency of their content words,
keep the top passages per document.  This is the summary/teaser stage of a
training-data pipeline (entity cards already do the KG-side equivalent) and
the per-doc twin of passage_windows_overlap's retrieval chunking.

Scale design: chunking is a pure per-row array expression; scoring is two
narrow aggregations — per-(doc, word) tf and per-(doc, chunk) score — both
keyed by doc_id, so every shuffle co-partitions on the document and the
final top-k is a doc-partitioned window (never a global sort).  Nothing
leaves the executor except (doc_id, chunk) aggregates.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions.udfs import bound, ws_tokens_expr
from .keywords import is_content_word


def passage_chunks(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text", size: int = 10
) -> DataFrame:
    """(id, chunk_idx, words) — consecutive token windows of ``size`` (the
    last chunk may be shorter), chunk_idx 1-based."""

    def chunks_from(t: Column) -> Column:
        nch = F.ceil(F.size(t) / F.lit(size)).cast("int")

        def chunk_at(i: Column) -> Column:
            return F.slice(t, (i - 1) * size + 1, size)

        return F.when(F.size(t) >= 1, F.transform(F.sequence(F.lit(1), nch), chunk_at))

    out = df.select(
        F.col(id_col),
        F.posexplode(bound(ws_tokens_expr(F.col(text_col)), chunks_from)).alias("p0", "words"),
    )
    return out.select(id_col, (F.col("p0") + 1).cast("int").alias("chunk_idx"), "words")


def extractive_summary(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    size: int = 10,
    top: int = 2,
    stopwords: list[str] | None = None,
) -> DataFrame:
    """Top-``top`` passages per document by mean content-word tf.

    score_i = round(1e4 * sum(tf_doc(w) for content words w in the passage,
    with multiplicity) / passage token count); ties break on chunk_idx (the
    earlier passage wins — the classic position prior).  Output:
    (id, chunk_idx, score_i, n_tok, passage_md5)."""
    chunks = passage_chunks(df, id_col, text_col, size)
    words = chunks.select(id_col, "chunk_idx", F.explode("words").alias("w"))

    is_content = is_content_word(F.col("w"), stopwords)
    content = words.filter(is_content)
    tf = content.groupBy(id_col, "w").agg(F.count(F.lit(1)).cast("long").alias("tf"))
    num = (
        content.join(tf, [id_col, "w"])
        .groupBy(id_col, "chunk_idx")
        .agg(F.sum("tf").cast("long").alias("num"))
    )
    base = chunks.select(
        F.col(id_col),
        "chunk_idx",
        F.size("words").cast("int").alias("n_tok"),
        F.md5(F.array_join(F.col("words"), " ")).alias("passage_md5"),
    )
    scored = base.join(num, [id_col, "chunk_idx"], "left").select(
        id_col,
        "chunk_idx",
        F.round(
            F.lit(10000) * F.coalesce(F.col("num"), F.lit(0)).cast("double") / F.col("n_tok")
        )
        .cast("long")
        .alias("score_i"),
        "n_tok",
        "passage_md5",
    )
    w = Window.partitionBy(id_col).orderBy(F.desc("score_i"), F.asc("chunk_idx"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= top)
        .drop("rk")
    )

