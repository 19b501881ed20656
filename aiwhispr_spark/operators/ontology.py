"""Ontology constraint induction + violation detection: induce each
predicate's dominant (subject-type, object-type) signature from the data
and flag the triples that deviate — the KG-quality gate that catches
extraction noise ("works_for" pointing at a city) before facts reach the
store.  Complements graph_query.predicate_profile (which REPORTS the
type distribution; this one elects a constraint and applies it) and
temporal.resolve_functional_facts (value conflicts; this is type
conflicts).

Semantics (oracle-mirrored):
* facts are DISTINCT (subj, pred, obj);
* each side types via the supplied ``types`` (entity, etype) table —
  entities absent from it type as ``unknown``;
* the expected signature per predicate is the most frequent
  (subj_type, obj_type) pair, ties broken (subj_type asc, obj_type asc);
* a violation is any fact whose pair differs from its predicate's
  expected signature; fully-consistent predicates emit nothing.

100 TB shape: the induced-signature table is |preds × type-pairs| rows —
its rank window partitions by pred (never global) and the elected
signatures join back BROADCAST onto the typed facts; the only
corpus-scale exchanges are the two entity-keyed type joins, which
co-partition with every other subj-keyed KG op (the bucketed triple
store, plans/kg_pipeline.write_bucketed_triples, feeds them
exchange-free on the subject side).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def type_constraint_violations(
    triples: DataFrame,
    types: DataFrame,
    subj_col: str = "subj",
    pred_col: str = "pred",
    obj_col: str = "obj",
) -> DataFrame:
    """(subj, pred, obj, subj_type, obj_type, exp_subj_type, exp_obj_type,
    exp_n, n_pred) — one row per fact violating its predicate's induced
    dominant type signature."""
    facts = triples.select(
        F.col(subj_col).alias("subj"),
        F.col(pred_col).alias("pred"),
        F.col(obj_col).alias("obj"),
    ).distinct()
    t = types.select(F.col("entity"), F.col("etype"))
    typed = (
        facts.join(t.withColumnRenamed("entity", "subj"), "subj", "left")
        .withColumnRenamed("etype", "_st")
        .join(t.withColumnRenamed("entity", "obj"), "obj", "left")
        .withColumnRenamed("etype", "_ot")
        .select(
            "subj",
            "pred",
            "obj",
            F.coalesce("_st", F.lit("unknown")).alias("subj_type"),
            F.coalesce("_ot", F.lit("unknown")).alias("obj_type"),
        )
    )
    sig = typed.groupBy("pred", "subj_type", "obj_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_sig")
    )
    w = Window.partitionBy("pred").orderBy(
        F.col("n_sig").desc(), F.col("subj_type").asc(), F.col("obj_type").asc()
    )
    expected = (
        sig.withColumn("_rk", F.row_number().over(w))
        .where(F.col("_rk") == 1)
        .select(
            "pred",
            F.col("subj_type").alias("exp_subj_type"),
            F.col("obj_type").alias("exp_obj_type"),
            F.col("n_sig").alias("exp_n"),
        )
    )
    n_pred = typed.groupBy("pred").agg(
        F.count(F.lit(1)).cast("long").alias("n_pred")
    )
    return (
        typed.join(F.broadcast(expected), "pred")
        .join(F.broadcast(n_pred), "pred")
        .where(
            (F.col("subj_type") != F.col("exp_subj_type"))
            | (F.col("obj_type") != F.col("exp_obj_type"))
        )
        .select(
            "subj", "pred", "obj", "subj_type", "obj_type",
            "exp_subj_type", "exp_obj_type", "exp_n", "n_pred",
        )
    )
