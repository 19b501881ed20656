"""Q4: full-text search as an inverted-index dataflow.

The reference's text-search arm (postgres: generated ``tsvector`` column + GIN
index, ``websearch_to_tsquery`` predicate, ``ts_rank`` ordering, LIMIT k —
postgresVectorDb.py:248,268,479,490-493; typesense ``_text_match:desc``
typesenseVectorDb.py:229-233) relies on an engine-side index.  Spark has no
secondary indexes, so the idiomatic recast is the index AS a table:

* ``build_inverted_index`` materializes (token, doc_id, tf) posting lists —
  one shuffle on token; at 100 TB this table is written bucketed by token so
  repeated searches join without re-shuffling the corpus.
* ``search_terms`` is then a broadcast join of the (tiny) query-term set
  against the postings, a partial-agg sum per doc, and a TakeOrderedAndProject
  top-k — the corpus itself is never rescanned or reshuffled.

Scoring is term-frequency sum (``any`` mode) with an all-terms-required
``all`` mode (the reference's websearch AND semantics); ts_rank's length
normalization is intentionally not replicated (engine-specific constant).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def tokenize(col) -> "F.Column":
    """Whitespace tokens of lowercased text — shared by index and query side."""
    return F.split(F.lower(F.trim(col)), r"\s+")


def build_inverted_index(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(token, id, tf) posting-list table."""
    return (
        df.select(F.col(id_col).alias("id"), F.explode(tokenize(F.col(text_col))).alias("token"))
        .filter(F.col("token") != "")
        .groupBy("token", "id")
        .agg(F.count(F.lit(1)).alias("tf"))
    )


def search_terms(
    index: DataFrame,
    terms: Sequence[str],
    k: int = 20,
    mode: str = "any",
) -> DataFrame:
    """Top-k (id, score, n_terms) over a posting-list table.  score = Σ tf of
    matched query terms; ``all`` mode keeps only docs matching every term.
    Deterministic order: score desc, id asc."""
    # dedupe up front: a repeated query term must not double-count tf in score
    terms = sorted({t.lower() for t in terms})
    spark = index.sparkSession
    q = spark.createDataFrame([(t,) for t in terms], "token string")
    scored = (
        index.join(F.broadcast(q), "token")
        .groupBy("id")
        .agg(
            F.sum("tf").cast("long").alias("score"),
            F.countDistinct("token").cast("int").alias("n_terms"),
        )
    )
    if mode == "all":
        scored = scored.filter(F.col("n_terms") == len(terms))
    elif mode != "any":
        raise ValueError(f"unknown search mode: {mode}")
    return scored.orderBy(F.col("score").desc(), F.col("id")).limit(k)
