"""Predicate-paraphrase detection: find relation pairs that hold between
the same (subject, object) pairs — DIRT-style (Lin & Pantel '01) relation
clustering reduced to exact set overlap.  An OpenIE-built KG (this
engine's E3 stage) mints one predicate per surface pattern; ``acquired``
and ``bought`` describing the same argument pairs are one relation to a
downstream consumer, and this table is what a curator reads to merge them
(the predicate-level twin of alias canonicalization, operators/
canonicalize.py).

Output per predicate pair (pred_a < pred_b, ``n_common >= min_common``):

    n_common   = |pairs(a) ∩ pairs(b)|   (distinct (subj, obj) pairs)
    n_a, n_b   = |pairs(a)|, |pairs(b)|
    jaccard_i  = n_common * 10000 div (n_a + n_b - n_common)   (exact int)

100 TB shape: candidates come from the ARGUMENT-PAIR self-join — the
exchange keys on (subj, obj) and its fan-out is Σ preds-per-pair², the
co-mention discipline (operators/kgsummary.py) — never a predicate cross
product; sizes join back on the |preds|-scale aggregate (broadcast under
AQE).  Everything is distinct/count aggregates, map-side combinable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def predicate_paraphrases(
    triples: DataFrame,
    min_common: int = 1,
    subj_col: str = "subj",
    pred_col: str = "pred",
    obj_col: str = "obj",
) -> DataFrame:
    """(pred_a, pred_b, n_common, n_a, n_b, jaccard_i) — see module
    contract."""
    pairs = triples.select(
        F.col(subj_col).alias("subj"),
        F.col(pred_col).alias("pred"),
        F.col(obj_col).alias("obj"),
    ).distinct()
    sizes = pairs.groupBy("pred").agg(F.count(F.lit(1)).cast("long").alias("n"))
    common = (
        pairs.alias("a")
        .join(
            pairs.alias("b"),
            (F.col("a.subj") == F.col("b.subj"))
            & (F.col("a.obj") == F.col("b.obj"))
            & (F.col("a.pred") < F.col("b.pred")),
        )
        .groupBy(
            F.col("a.pred").alias("pred_a"), F.col("b.pred").alias("pred_b")
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n_common"))
        .filter(F.col("n_common") >= int(min_common))
    )
    return (
        common.join(sizes.select(F.col("pred").alias("pred_a"), F.col("n").alias("n_a")), "pred_a")
        .join(sizes.select(F.col("pred").alias("pred_b"), F.col("n").alias("n_b")), "pred_b")
        .select(
            "pred_a",
            "pred_b",
            "n_common",
            "n_a",
            "n_b",
            F.expr("n_common * 10000 div (n_a + n_b - n_common)")
            .cast("long")
            .alias("jaccard_i"),
        )
    )

def inverse_predicates(
    triples: DataFrame,
    min_common: int = 1,
    subj_col: str = "subj",
    pred_col: str = "pred",
    obj_col: str = "obj",
) -> DataFrame:
    """(pred_a, pred_b, n_common, n_a, n_b, inv_score_i) — inverse-relation
    detection, the REVERSED-argument twin of ``predicate_paraphrases``: a
    pair qualifies when ``a(s, o)`` co-occurs with ``b(o, s)``.  An
    OpenIE-built KG mints both active and passive surface forms
    (``acquired`` / ``acquired_by``); this table is what a curator reads to
    fold one into the other's inverse, and the diagonal rows
    (``pred_a == pred_b``) measure SYMMETRY — ``n_common`` there counts
    directed facts whose mirror is also asserted (each unordered symmetric
    pair contributes twice, so inv_score_i == 10000 means fully symmetric,
    e.g. ``partnered_with``).

        n_common    = |{(s,o) ∈ pairs(a) : (o,s) ∈ pairs(b)}|  (directed)
        inv_score_i = n_common * 10000 div min(n_a, n_b)       (exact int)

    Self-loop facts (s == o) mirror themselves and count; they inflate the
    diagonal by design (a self-loop IS symmetric) and the off-diagonal
    only when both predicates assert the same loop.

    100 TB shape: same co-mention discipline as paraphrases — the exchange
    keys on the ARGUMENT pair (one side pre-swapped, so both sides hash to
    the same (lo, hi)-free key layout), fan-out Σ preds-per-pair², never a
    predicate cross product; sizes join back broadcast-sized.
    """
    pairs = triples.select(
        F.col(subj_col).alias("subj"),
        F.col(pred_col).alias("pred"),
        F.col(obj_col).alias("obj"),
    ).distinct()
    sizes = pairs.groupBy("pred").agg(F.count(F.lit(1)).cast("long").alias("n"))
    swapped = pairs.select(
        F.col("obj").alias("subj"), F.col("pred"), F.col("subj").alias("obj")
    )
    common = (
        pairs.alias("a")
        .join(
            swapped.alias("b"),
            (F.col("a.subj") == F.col("b.subj"))
            & (F.col("a.obj") == F.col("b.obj"))
            & (F.col("a.pred") <= F.col("b.pred")),
        )
        .groupBy(
            F.col("a.pred").alias("pred_a"), F.col("b.pred").alias("pred_b")
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n_common"))
        .filter(F.col("n_common") >= int(min_common))
    )
    return (
        common.join(
            sizes.select(F.col("pred").alias("pred_a"), F.col("n").alias("n_a")),
            "pred_a",
        )
        .join(
            sizes.select(F.col("pred").alias("pred_b"), F.col("n").alias("n_b")),
            "pred_b",
        )
        .select(
            "pred_a",
            "pred_b",
            "n_common",
            "n_a",
            "n_b",
            F.expr("n_common * 10000 div least(n_a, n_b)")
            .cast("long")
            .alias("inv_score_i"),
        )
    )
