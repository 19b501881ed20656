"""SHACL-lite shape validation over the knowledge graph.

A production KG ships with a shapes catalog — per entity class, which
predicates are allowed, their cardinality bounds, and the class their
objects must belong to (W3C SHACL's sh:minCount / sh:maxCount / sh:class /
sh:closed, reduced to the tabular core).  Validation is the quality gate
between extraction and publication: it catches the extractor emitting two
employers for one person, a works_for edge pointing at a place, or a
predicate no shape declares.  The reference has no schema layer at all
(triples are implicit in its chunk/embedding tables — `python/textprocessor`
in prasaar/aiwhispr); this is the ontology-side completion of
operators/ontology.py's INDUCED profiles: there the schema is mined from
the data, here a DECLARED schema judges the data.

Checks emitted (violation column):
* ``min_count``  — a typed entity asserts fewer than min_count facts for a
  declared predicate (observed = the count, possibly 0);
* ``max_count``  — more than max_count facts (observed = the count);
* ``class_range`` — objects whose entity type differs from the declared
  ``obj_etype`` (untyped objects count as violations — strict semantics;
  observed = the number of offending objects);
* ``closed``     — facts whose (class, predicate) no shape declares
  (sh:closed; observed = the fact count).

Untyped SUBJECTS are skipped entirely: no class, no shape to judge by.

100 TB shape:
* the shapes catalog is dozens-to-thousands of rows → broadcast; the
  min_count grid (types × shapes-per-class) fans out each entity by its
  class's declared predicate count — bounded small;
* every corpus-scale exchange keys on an ENTITY id (the per-subject fact
  counts, the object→type lookup), i.e. entity cardinality, never fact ×
  fact; all checks are built-in expressions, zero python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

OUT_COLS = ["subj", "etype", "pred", "violation", "observed"]


def shape_violations(
    triples: DataFrame, types: DataFrame, shapes: DataFrame
) -> DataFrame:
    """Validate ``triples`` (subj, pred, obj) for entities typed by
    ``types`` (entity, etype) against ``shapes`` (etype, pred, min_count,
    max_count NULL=unbounded, obj_etype NULL=unconstrained) →
    (subj, etype, pred, violation, observed)."""
    t = types.select(F.col("entity").alias("subj"), F.col("etype").alias("etype"))
    typed = triples.join(t, "subj")
    sh = F.broadcast(
        shapes.select("etype", "pred", "min_count", "max_count", "obj_etype")
    )

    counts = typed.groupBy("subj", "etype", "pred").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )

    # cardinality grid: every declared predicate of every typed entity,
    # LEFT-joined to observed counts so absent facts surface as n=0
    grid = t.join(sh.select("etype", "pred", "min_count", "max_count"), "etype")
    card = grid.join(counts, ["subj", "etype", "pred"], "left").withColumn(
        "n", F.coalesce("n", F.lit(0).cast("long"))
    )
    viol_min = card.filter(F.col("n") < F.col("min_count")).select(
        "subj", "etype", "pred", F.lit("min_count").alias("violation"),
        F.col("n").alias("observed"),
    )
    viol_max = card.filter(
        F.col("max_count").isNotNull() & (F.col("n") > F.col("max_count"))
    ).select(
        "subj", "etype", "pred", F.lit("max_count").alias("violation"),
        F.col("n").alias("observed"),
    )

    # class-range: objects of a range-constrained predicate whose type is
    # absent or differs from the declared object class
    ranged = typed.join(
        sh.filter(F.col("obj_etype").isNotNull()).select("etype", "pred", "obj_etype"),
        ["etype", "pred"],
    )
    # one row per object with its full type set: a multi-typed object
    # conforms when ANY of its types matches, and the left join cannot fan
    # a conforming triple out into a spurious violation row
    ot = types.groupBy(F.col("entity").alias("obj")).agg(
        F.collect_set("etype").alias("obj_types")
    )
    viol_range = (
        ranged.join(ot, "obj", "left")
        .filter(
            F.col("obj_types").isNull()
            | ~F.array_contains("obj_types", F.col("obj_etype"))
        )
        .groupBy("subj", "etype", "pred")
        .agg(F.count(F.lit(1)).cast("long").alias("observed"))
        .select(
            "subj", "etype", "pred", F.lit("class_range").alias("violation"),
            "observed",
        )
    )

    # closed-world: facts whose (class, pred) no shape declares
    viol_closed = (
        typed.join(sh.select("etype", "pred"), ["etype", "pred"], "left_anti")
        .groupBy("subj", "etype", "pred")
        .agg(F.count(F.lit(1)).cast("long").alias("observed"))
        .select(
            "subj", "etype", "pred", F.lit("closed").alias("violation"), "observed"
        )
    )

    return (
        viol_min.select(OUT_COLS)
        .unionByName(viol_max.select(OUT_COLS))
        .unionByName(viol_range.select(OUT_COLS))
        .unionByName(viol_closed.select(OUT_COLS))
    )
