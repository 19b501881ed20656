"""Q1/Q2/Q3/Q8: exact top-k cosine search and score transforms.

The reference's semantic search (searchService.py:73-97 → per-connector ANN,
e.g. postgresVectorDb.py:477-509 ``ORDER BY vector_embedding <=> q LIMIT k``)
is an *approximation* of exact top-k cosine.  Our engine computes the exact
answer: the query vector is a broadcast scalar folded into a JVM-side
expression, and ``ORDER BY score DESC LIMIT k`` compiles to Spark's
``TakeOrderedAndProject`` — a per-partition heap + driver merge, no global
sort, no shuffle of the full table.  At 100 TB this scans embeddings with
column pruning (only id + vector columns are read) and moves exactly
``k × partitions`` rows.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.udfs import cosine_expr

DEFAULT_LIMIT_HITS = 25  # searchService.py:50


def cosine_topk(
    df: DataFrame,
    query_vector: list[float],
    vec_col: str = "embedding",
    k: int = DEFAULT_LIMIT_HITS,
    score_col: str = "match_score",
) -> DataFrame:
    """Exact top-k by cosine similarity to a constant query vector."""
    scored = df.withColumn(score_col, cosine_expr(vec_col, query_vector))
    return scored.orderBy(F.col(score_col).desc(), *_tiebreak(df)).limit(k)


def _tiebreak(df: DataFrame) -> list[Column]:
    """Deterministic tie-break on the first id-ish column, so top-k boundaries
    are stable across engines and runs."""
    for c in ("vec_id", "id", "url"):
        if c in df.columns:
            return [F.col(c)]
    return []


def score_to_distance(score: Column) -> Column:
    """Q2: similarity → distance (6_Semantic_Search.py:137-140)."""
    return F.lit(1.0) - score


def distance_angle(distance: Column) -> Column:
    """Q3: angle = acos(distance) (6_Semantic_Search.py:142)."""
    return F.acos(distance)


def rank_tiers(
    df: DataFrame, score_col: str = "match_score", tier_col: str = "tier"
) -> DataFrame:
    """Q8: hits 1-5 'blue', 6-10 'orange', rest 'red'
    (6_Semantic_Search.py:370-379,408-418).  Window has no partition key by
    design — it runs on an already-top-k (≤25 row) result, never on the full
    table."""
    w = Window.orderBy(F.col(score_col).desc(), *_tiebreak(df))
    rank = F.row_number().over(w)
    return df.withColumn(
        tier_col,
        F.when(rank <= 5, F.lit("blue")).when(rank <= 10, F.lit("orange")).otherwise(F.lit("red")),
    )


def topk_incremental_merge(parts, k: int, order_cols) -> DataFrame:
    """Mergeable row-level top-k: global top-k = top-k of the UNION of
    per-batch top-k's — exact for ROW-level scores (each batch's local
    top-k is a superset of its contribution to the global answer; no
    deletions).  NOT valid for aggregated scores (a key outside every
    local top-k can still win globally after summation) — that case needs
    the full re-aggregate; the docstring is the guard.

    100 TB shape: each incremental batch maintains only k rows; the merge
    ranks |parts|·k rows via TakeOrderedAndProject — the nightly top-k
    refresh never rescans history."""
    pruned = [p.orderBy(*order_cols).limit(k) for p in parts]
    u = pruned[0]
    for p in pruned[1:]:
        u = u.unionByName(p)
    return u.orderBy(*order_cols).limit(k)
