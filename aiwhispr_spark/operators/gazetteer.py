"""Gazetteer (dictionary) entity tagging — the lexicon-driven complement to
the SVO-regex mention extractor (kernels.py E3): match a controlled
vocabulary of 1- and 2-token surface forms against the token stream with
LONGEST-MATCH-WINS semantics (a bigram match consumes both its token
positions, so the unigram inside it does not also fire) — the Aho-Corasick
leftmost-longest convention recast as joins.

Scale design: the gazetteer is a dimension table (thousands of rows at
most) and is ALWAYS broadcast; the fact side ships (doc_id, pos, token) /
(doc_id, pos, bigram) rows, so the matcher runs as two broadcast hash joins
+ one broadcast anti-join (coverage cut) — no all-to-all shuffle of
document text, and the whole plan survives a 100x corpus scale-up
unchanged.  Token/bigram streams are built with bound() array expressions
(no HOF re-eval), positions are 1-based token indexes.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.udfs import bound, ws_tokens_expr


def token_stream(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(id, pos, tok) — 1-based token positions."""
    out = df.select(F.col(id_col), F.posexplode(ws_tokens_expr(F.col(text_col))).alias("p0", "tok"))
    return out.select(id_col, (F.col("p0") + 1).cast("int").alias("pos"), "tok")


def bigram_stream(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(id, pos, bigram) — bigram starting at 1-based token position pos."""

    def pairs_from(t: Column) -> Column:
        def pair_at(i: Column) -> Column:
            return F.concat_ws(" ", F.element_at(t, i), F.element_at(t, i + 1))

        return F.when(
            F.size(t) >= 2, F.transform(F.sequence(F.lit(1), F.size(t) - 1), pair_at)
        )

    out = df.select(
        F.col(id_col), F.posexplode(bound(ws_tokens_expr(F.col(text_col)), pairs_from)).alias("p0", "bigram")
    )
    return out.select(id_col, (F.col("p0") + 1).cast("int").alias("pos"), "bigram")


def tag_gazetteer(
    df: DataFrame,
    gazetteer: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Tag documents against a gazetteer of (surface, etype) rows, surfaces
    being 1 or 2 lowercase whitespace-separated tokens.

    Longest match wins: a unigram hit at position p is dropped when any
    bigram hit covers p (starts at p or p-1).  Returns one row per match:
    (id, pos, surface, etype).
    """
    g = gazetteer.select(
        F.col("surface"),
        F.col("etype"),
        F.size(F.split(F.col("surface"), " ")).alias("nw"),
    )
    g1 = F.broadcast(g.filter(F.col("nw") == 1).select("surface", "etype"))
    g2 = F.broadcast(g.filter(F.col("nw") == 2).select("surface", "etype"))

    big_hits = bigram_stream(df, id_col, text_col).join(
        g2, F.col("bigram") == F.col("surface")
    ).select(id_col, "pos", "surface", "etype")

    covered = big_hits.select(
        F.col(id_col), F.explode(F.array(F.col("pos"), F.col("pos") + 1)).alias("pos")
    ).distinct()

    uni_hits = token_stream(df, id_col, text_col).join(
        g1, F.col("tok") == F.col("surface")
    ).select(id_col, "pos", "surface", "etype")
    # NOT broadcast: covered grows with match volume (data-sized, unlike the
    # gazetteer); a shuffle anti-join on (id, pos) co-partitions with uni_hits
    # and stays safe at any corpus size (AQE may still downgrade it to
    # broadcast when the match set is actually small).
    kept_uni = uni_hits.join(covered, [id_col, "pos"], "left_anti")

    return big_hits.unionByName(kept_uni)


def gazetteer_doc_summary(matches: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Per (doc, surface) rollup: hit count + first match position."""
    return matches.groupBy(id_col, "surface", "etype").agg(
        F.count(F.lit(1)).cast("long").alias("n_hits"),
        F.min("pos").cast("int").alias("first_pos"),
    )
