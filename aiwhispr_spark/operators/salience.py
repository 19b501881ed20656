"""Entity salience scoring: rank the entities of each document by how
early and how often they are mentioned — the standard retrieval/KG-weight
signal (Gamon et al. '13 "entity salience" line of work) that decides which
page a fact should be attributed to when the same entity appears on
thousands of pages.

Formula (integer-exact, oracle-mirrored):

    salience_i = (n_hits * scale) div (first_pos + damp)

* frequency scales linearly; earliness via integer division by the damped
  first token position (damp keeps position-1 mentions from dwarfing
  everything; div is exact in both engines — no float ever enters);
* per-document rank ``rk`` orders by salience desc, surface asc (total,
  deterministic).

Input is any (doc, pos, surface, etype) mention stream — the gazetteer
tagger (operators/gazetteer.py::tag_gazetteer) is the canonical producer.

100 TB shape: one groupBy keyed on (doc, surface) — co-partitioned with
the mention stream's natural doc keying — then a window PARTITIONED BY
doc (entities-per-doc sized, never global).  Pure JVM expressions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .gazetteer import gazetteer_doc_summary


def entity_salience(
    matches: DataFrame,
    id_col: str = "doc_id",
    scale: int = 1_000_000,
    damp: int = 9,
) -> DataFrame:
    """(doc, surface, etype, n_hits, first_pos, salience_i, rk) per entity
    mention group (see module contract)."""
    rolled = gazetteer_doc_summary(matches, id_col)
    sal = rolled.withColumn(
        "salience_i",
        F.expr(f"n_hits * {int(scale)} div (first_pos + {int(damp)})").cast("long"),
    )
    w = Window.partitionBy(id_col).orderBy(F.desc("salience_i"), F.asc("surface"))
    return sal.withColumn("rk", F.row_number().over(w).cast("int"))
