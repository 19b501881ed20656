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


def authority_weighted_mentions(
    mentions: DataFrame,
    host_rank: DataFrame,
    url_col: str = "url",
    entity_col: str = "entity",
) -> DataFrame:
    """Corpus-level entity authority: each mention contributes its source
    HOST's PageRank, so an entity named once by a hub outranks one spammed
    across link-farm pages — the anti-spam complement to raw mention counts
    (entity_salience above is per-document; this is per-corpus).

    ``host_rank`` is a (node, pr_i) frame from operators/graph.py::pagerank
    over the host graph.  Output per entity: ``n_mentions``, ``n_hosts``
    (distinct mentioning hosts), ``authority_i`` = Σ pr_i(host) over mention
    rows (BIGINT sum of scaled ints — exact).  Mentions on unranked hosts
    count toward n_mentions/n_hosts but add 0 authority (left join), so a
    host outside the link graph can never be silently dropped.

    100 TB shape: host extraction is narrow; the |hosts|-sized rank table
    broadcasts onto the mention stream (AQE), and the per-entity aggregate
    map-side combines.  One exchange total.
    """
    from aiwhispr_spark.operators.linkgraph import host_of

    keyed = mentions.select(
        F.col(entity_col).alias("entity"),
        host_of(F.col(url_col)).alias("host"),
    )
    ranked = keyed.join(
        F.broadcast(host_rank.select(F.col("node").alias("host"), "pr_i")),
        "host",
        "left",
    )
    return ranked.groupBy("entity").agg(
        F.count(F.lit(1)).cast("long").alias("n_mentions"),
        F.countDistinct("host").cast("long").alias("n_hosts"),
        F.sum(F.coalesce("pr_i", F.lit(0))).cast("long").alias("authority_i"),
    )
