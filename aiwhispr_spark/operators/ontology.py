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

from pyspark.sql import Column, DataFrame, Window
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


# literal-shape classification rules, FIRST MATCH WINS (oracle-mirrored;
# Java≡RE2-common subset — no lookaround/backrefs)
_DTYPE_RULES: list[tuple[str, str]] = [
    ("date", r"^[0-9]{4}-[0-9]{2}-[0-9]{2}$"),
    ("year", r"^(1[89][0-9]{2}|20[0-9]{2})$"),
    ("integer", r"^-?[0-9]+$"),
    ("decimal", r"^-?[0-9]+\.[0-9]+$"),
    ("url", r"^https?://"),
    ("proper_name", r"^[A-Z][A-Za-z0-9_]*( [A-Z0-9][A-Za-z0-9_]*)*$"),
]


def literal_dtype_expr(obj: Column) -> Column:
    """Shape-classify one literal value (documented rule table above;
    anything unmatched is free ``text``)."""
    expr = F.lit("text")
    for name, rx in reversed(_DTYPE_RULES):
        expr = F.when(obj.rlike(rx), F.lit(name)).otherwise(expr)
    return expr


def _typed_facts(
    triples: DataFrame, subj_col: str, pred_col: str, obj_col: str
) -> DataFrame:
    """DISTINCT facts with their literal dtype — the shared subtree of the
    induction and the enforcement pass (identical subplans ⇒ the distinct
    exchange is ReusedExchange-eligible when both consume it in one job,
    the unigram-LM vocab pattern)."""
    return triples.select(
        F.col(subj_col).alias("subj"),
        F.col(pred_col).alias("pred"),
        F.col(obj_col).alias("obj"),
    ).distinct().select(
        "subj", "pred", "obj", literal_dtype_expr(F.col("obj")).alias("dtype")
    )


def _profile_from_typed(typed: DataFrame) -> DataFrame:
    """(pred, dtype, n_values, n_total, share_pm, is_dominant_i) — the ONE
    dominance election, shared by induction and enforcement."""
    prof = typed.groupBy("pred", "dtype").agg(
        F.count(F.lit(1)).cast("long").alias("n_values")
    )
    w_tot = Window.partitionBy("pred")
    w_rk = Window.partitionBy("pred").orderBy(
        F.col("n_values").desc(), F.col("dtype").asc()
    )
    return prof.select(
        "pred",
        "dtype",
        "n_values",
        F.sum("n_values").over(w_tot).cast("long").alias("n_total"),
        F.expr(
            "1000 * n_values div sum(n_values) OVER (PARTITION BY pred)"
        ).cast("long").alias("share_pm"),
        (F.row_number().over(w_rk) == 1).cast("int").alias("is_dominant_i"),
    )


def infer_literal_datatypes(
    triples: DataFrame,
    subj_col: str = "subj",
    pred_col: str = "pred",
    obj_col: str = "obj",
) -> DataFrame:
    """Predicate RANGE-datatype induction over literal shapes — the other
    half of ontology induction next to :func:`type_constraint_violations`
    (that one types ENTITY arguments via an external table; this one types
    the VALUE SHAPE of every object string, so mined predicates get an
    xsd-style datatype: ``founded_in → year``, ``employees → integer``,
    ``homepage → url``).  Consumers cast/validate against the dominant
    dtype and quarantine the non-conforming tail.

    Output: one row per (pred, dtype) — ``(pred, dtype, n_values, n_total,
    share_pm, is_dominant_i)`` with share_pm = 1000·n div total (integer),
    dominance elected by (count desc, dtype asc) — deterministic ties.
    Counts are over DISTINCT facts, so a mirrored page never inflates a
    predicate's profile.

    100 TB shape: distinct on the triple, narrow JVM regex classification,
    ONE map-side-combinable groupBy onto a |preds × 7| key space; the rank
    window partitions by pred over ≤7 rows each — never global.
    """
    return _profile_from_typed(
        _typed_facts(triples, subj_col, pred_col, obj_col)
    )


def apply_datatype_constraints(
    triples: DataFrame,
    subj_col: str = "subj",
    pred_col: str = "pred",
    obj_col: str = "obj",
) -> DataFrame:
    """Enforcement pass over :func:`infer_literal_datatypes`: every fact is
    checked against its predicate's DOMINANT induced datatype — conforming
    facts keep flowing, deviants are flagged for quarantine (the mined-KG
    equivalent of a failed CHECK constraint; extraction noise like
    ``founded_in → 'circa 1994'`` surfaces here instead of poisoning casts
    downstream).

    Output: (subj, pred, obj, dtype, exp_dtype, conforms_i) over DISTINCT
    facts — dominance comes from the SAME election as the induction
    (`_profile_from_typed`, one source of truth).

    100 TB shape: the profile branch and the probe branch consume the
    IDENTICAL typed-facts subplan, so the triple distinct is
    ReusedExchange-eligible (one physical distinct at runtime — the
    unigram-LM vocab-reuse pattern); the |preds × 7| dominant table
    broadcasts back; classification stays a narrow JVM regex.
    """
    typed = _typed_facts(triples, subj_col, pred_col, obj_col)
    dominant = (
        _profile_from_typed(typed)
        .filter(F.col("is_dominant_i") == 1)
        .select("pred", F.col("dtype").alias("exp_dtype"))
    )
    return typed.join(F.broadcast(dominant), "pred").select(
        "subj",
        "pred",
        "obj",
        "dtype",
        "exp_dtype",
        (F.col("dtype") == F.col("exp_dtype")).cast("int").alias("conforms_i"),
    )


def predicate_key_profile(
    triples: DataFrame,
    subj_col: str = "subj",
    pred_col: str = "pred",
    obj_col: str = "obj",
) -> DataFrame:
    """Functional / inverse-functional key discovery over the induced KG —
    the ER planner's input: a predicate whose subjects map to exactly one
    object (functional, e.g. based_in) supports conflict resolution by
    election; one whose OBJECTS map to exactly one subject
    (inverse-functional, e.g. a registration id) is a merge KEY — two
    entity surfaces sharing an inverse-functional object are the same
    entity (the owl:InverseFunctionalProperty smushing rule).

    Output, one row per predicate over DISTINCT facts:
      (pred, n_facts, n_subj, n_obj, max_out, max_in,
       func_ratio_i, inv_func_ratio_i, is_functional_i, is_inverse_functional_i)
    where max_out = the largest distinct-object fanout of any subject,
    func_ratio_i = round(1e4 · n_subj / n_facts) (1.0 ⇔ functional), and
    the flags are the exact max==1 tests.

    100 TB shape: facts → groupBy(pred, subj) and groupBy(pred, obj)
    counts (map-side combinable; facts are pre-distinct so count(*) IS
    the distinct count), then two |preds × entities|→|preds| rollups and
    a |preds|-row join — the only corpus-scale exchanges are the two
    degree groupBys, and the subject-side one co-partitions with the
    bucketed triple store.  No windows, no python.
    """
    facts = triples.select(
        F.col(subj_col).alias("subj"),
        F.col(pred_col).alias("pred"),
        F.col(obj_col).alias("obj"),
    ).distinct()
    out_deg = facts.groupBy("pred", "subj").agg(F.count("*").alias("d_out"))
    in_deg = facts.groupBy("pred", "obj").agg(F.count("*").alias("d_in"))
    per_pred_out = out_deg.groupBy("pred").agg(
        F.sum("d_out").alias("n_facts"),
        F.count("*").alias("n_subj"),
        F.max("d_out").alias("max_out"),
    )
    per_pred_in = in_deg.groupBy("pred").agg(
        F.count("*").alias("n_obj"),
        F.max("d_in").alias("max_in"),
    )
    return per_pred_out.join(per_pred_in, "pred").select(
        "pred",
        F.col("n_facts").cast("long").alias("n_facts"),
        F.col("n_subj").cast("long").alias("n_subj"),
        F.col("n_obj").cast("long").alias("n_obj"),
        F.col("max_out").cast("long").alias("max_out"),
        F.col("max_in").cast("long").alias("max_in"),
        F.round(F.lit(10000.0) * F.col("n_subj") / F.col("n_facts"))
        .cast("long")
        .alias("func_ratio_i"),
        F.round(F.lit(10000.0) * F.col("n_obj") / F.col("n_facts"))
        .cast("long")
        .alias("inv_func_ratio_i"),
        (F.col("max_out") == 1).cast("long").alias("is_functional_i"),
        (F.col("max_in") == 1).cast("long").alias("is_inverse_functional_i"),
    )


def owl_materialize(
    triples: DataFrame,
    symmetric: list[str],
    inverse: dict[str, str],
    transitive: list[str],
    max_hops: int = 4,
    subj_col: str = "subj",
    pred_col: str = "pred",
    obj_col: str = "obj",
) -> DataFrame:
    """OWL-lite forward inference over the asserted facts: materialize the
    entailments of owl:SymmetricProperty (``symmetric`` preds mirror),
    owl:inverseOf (``inverse[p] = q`` emits (o, q, s) for every (s, p, o)),
    and owl:TransitiveProperty (``transitive`` preds close under bounded
    composition, ≤ ``max_hops``).

    Output: (subj, pred, obj, origin) over the DISTINCT union of asserted
    + inferred facts, where ``origin`` labels HOW the fact is cheapest to
    derive — fixed priority asserted > symmetric > inverse > transitive
    (a fact both asserted and entailed reports 'asserted'), so the
    inferred-only delta is exactly the origin != 'asserted' slice.

    100 TB shape: symmetric/inverse inference is a narrow projection (zero
    exchanges — column swap + literal pred); only the transitive preds pay
    the iterative join, and that runs per-predicate on the pred-filtered
    edge slice (graph_query.transitive_closure: BFS frontier + visited
    anti-join, persisted per hop).  The final distinct-with-priority is
    ONE groupBy on (subj, pred, obj) taking min(rank) — map-side
    combinable, fixed-width rows.
    """
    facts = triples.select(
        F.col(subj_col).alias("subj"),
        F.col(pred_col).alias("pred"),
        F.col(obj_col).alias("obj"),
    ).distinct()
    candidates = [facts.withColumn("rank", F.lit(0))]
    if symmetric:
        candidates.append(
            facts.filter(F.col("pred").isin(symmetric))
            .select(
                F.col("obj").alias("subj"), "pred", F.col("subj").alias("obj")
            )
            .withColumn("rank", F.lit(1))
        )
    for p, q in sorted(inverse.items()):
        candidates.append(
            facts.filter(F.col("pred") == p)
            .select(
                F.col("obj").alias("subj"),
                F.lit(q).alias("pred"),
                F.col("subj").alias("obj"),
            )
            .withColumn("rank", F.lit(2))
        )
    from aiwhispr_spark.operators.graph_query import transitive_closure

    for p in sorted(set(transitive)):
        edges = facts.filter(F.col("pred") == p).select(
            F.col("subj").alias("src"), F.col("obj").alias("dst")
        )
        closed = transitive_closure(edges, max_hops=max_hops)
        candidates.append(
            closed.filter(F.col("hops") >= 2).select(
                F.col("src").alias("subj"),
                F.lit(p).alias("pred"),
                F.col("dst").alias("obj"),
                F.lit(3).alias("rank"),
            )
        )
    allc = candidates[0]
    for c in candidates[1:]:
        allc = allc.unionByName(c)
    best = allc.groupBy("subj", "pred", "obj").agg(F.min("rank").alias("r"))
    origin = (
        F.when(F.col("r") == 0, F.lit("asserted"))
        .when(F.col("r") == 1, F.lit("symmetric"))
        .when(F.col("r") == 2, F.lit("inverse"))
        .otherwise(F.lit("transitive"))
    )
    return best.select("subj", "pred", "obj", origin.alias("origin"))
