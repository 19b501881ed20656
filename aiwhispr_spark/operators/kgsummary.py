"""Entity-product surfaces over the materialized KG: fact ranking for
entity summaries and co-mention relatedness for "related entities".

These consume the (url, subj, pred, obj) triple stream the E1-E7 pipeline
materializes (the reference stops at chunk retrieval; entity cards /
related-entity panels are what a KG actually serves — the summarization
tier on top of `__spark_entry__.kg_entity_cards`).

Float discipline (CLAUDE.md): informativeness and PMI each take ONE `ln`
over one double division of exact BIGINT products, then round to a scaled
BIGINT — no float accumulation, so the values hash-gate cross-engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def fact_informativeness(
    triples: DataFrame,
    top_k: int = 3,
    subj_col: str = "subj",
    pred_col: str = "pred",
    obj_col: str = "obj",
) -> DataFrame:
    """(subj, pred, obj, idf_i, fact_rank) — each entity's ``top_k`` most
    INFORMATIVE facts, where informativeness is the IDF of the (pred, obj)
    pair over subjects: ``idf_i = round(1e6 · ln(N / df))`` with ``df`` the
    number of distinct subjects asserting that (pred, obj) and ``N`` the
    total distinct subjects.  "based_in Berlin" (shared by many) ranks
    below "acquired E7 Corp" (unique) — the fact a summary should lead
    with.  Ties break (pred, obj) ascending; ranks are subject-PARTITIONED
    row_numbers (never a global window).

    100 TB shape: the df table aggregates to |distinct (pred, obj)| rows
    (map-side combined) and joins back keyed on the pair; N is one scalar
    cross-joined broadcast; the top-k window partitions by subject."""
    facts = triples.select(
        F.col(subj_col).alias("subj"),
        F.col(pred_col).alias("pred"),
        F.col(obj_col).alias("obj"),
    ).distinct()
    df_tbl = facts.groupBy("pred", "obj").agg(
        F.countDistinct("subj").cast("long").alias("df")
    )
    n_tbl = facts.groupBy().agg(
        F.countDistinct("subj").cast("long").alias("n_subj_total")
    )
    scored = (
        facts.join(df_tbl, ["pred", "obj"])
        .crossJoin(F.broadcast(n_tbl))
        .select(
            "subj",
            "pred",
            "obj",
            F.round(
                F.lit(1e6)
                * F.log(
                    F.col("n_subj_total").cast("double") / F.col("df").cast("double")
                )
            )
            .cast("long")
            .alias("idf_i"),
        )
    )
    w = Window.partitionBy("subj").orderBy(
        F.desc("idf_i"), F.asc("pred"), F.asc("obj")
    )
    return (
        scored.withColumn("fact_rank", F.row_number().over(w).cast("int"))
        .where(F.col("fact_rank") <= top_k)
    )


def entity_comention_pmi(
    triples: DataFrame,
    min_pages: int = 2,
    url_col: str = "url",
    subj_col: str = "subj",
    obj_col: str = "obj",
) -> DataFrame:
    """(a, b, n_pages_pair, pmi_i) — entity relatedness from page-level
    co-mention: entities a < b that share at least ``min_pages`` pages,
    scored ``pmi_i = round(1e6 · ln(c(a,b) · N / (c(a) · c(b))))`` over
    exact BIGINT page counts (N = pages with any mention).  The KG's
    "related entities" panel, independent of explicit edges.

    100 TB shape: the mention table collapses to DISTINCT (url, entity)
    first; the pair join is url-keyed with fan-out quadratic in per-page
    DISTINCT entities — bounded by page length in practice (cap or salt
    pathological pages via operators/skew.py); per-entity and pair
    aggregates are map-side combinable; N is one scalar broadcast."""
    m = (
        triples.select(F.col(url_col).alias("url"), F.col(subj_col).alias("entity"))
        .unionByName(
            triples.select(F.col(url_col).alias("url"), F.col(obj_col).alias("entity"))
        )
        .distinct()
    )
    n_tbl = m.groupBy().agg(F.countDistinct("url").cast("long").alias("n_pages"))
    ent = m.groupBy("entity").agg(F.count(F.lit(1)).cast("long").alias("c"))
    pairs = (
        m.alias("l")
        .join(m.alias("r"), "url")
        .where(F.col("l.entity") < F.col("r.entity"))
        .groupBy(
            F.col("l.entity").alias("a"), F.col("r.entity").alias("b")
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n_pages_pair"))
        .where(F.col("n_pages_pair") >= min_pages)
    )
    return (
        pairs.join(ent.select(F.col("entity").alias("a"), F.col("c").alias("ca")), "a")
        .join(ent.select(F.col("entity").alias("b"), F.col("c").alias("cb")), "b")
        .crossJoin(F.broadcast(n_tbl))
        .select(
            "a",
            "b",
            "n_pages_pair",
            F.round(
                F.lit(1e6)
                * F.log(
                    (F.col("n_pages_pair") * F.col("n_pages")).cast("double")
                    / (F.col("ca") * F.col("cb")).cast("double")
                )
            )
            .cast("long")
            .alias("pmi_i"),
        )
    )
