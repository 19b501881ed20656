"""RDF N-Triples serialization of the materialized triple store — the
interchange format every downstream graph stack (SPARQL stores, RDF tooling,
LOD pipelines) ingests directly.

The reference materializes chunks/vectors into vector DBs only
(`python/vectordb/*VectorDb.py`); a KG-construction engine must also EXPORT
its (subj, pred, obj) tables in the standard serialization, so this is
first-class here.

Semantics (RDF 1.1 N-Triples, the subset our string-literal triples need):

* subject/predicate become IRIs under a caller-supplied base
  (``<urn:kg:e:...>`` / ``<urn:kg:p:...>``), with spaces %-encoded — the only
  non-IRI-safe byte our canonical entity surface forms contain;
* objects serialize as plain string literals with the canonical escapes:
  ``\\`` ``\"`` ``\n`` ``\r`` ``\t`` (backslash FIRST — escaping is
  order-sensitive);
* one line per triple: ``<s> <p> "o" .``.

100 TB shape: a pure narrow JVM expression chain (five literal ``replace``
calls + concat) over the triples table — zero shuffle, zero python, writes
stream straight to text files partition-parallel.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _iri(base: str, term: Column) -> Column:
    return F.concat(F.lit("<" + base), F.replace(term, F.lit(" "), F.lit("%20")), F.lit(">"))


def escape_literal_expr(col: Column) -> Column:
    """N-Triples string-literal escaping (backslash first, then quote and
    the control characters)."""
    out = F.replace(col, F.lit("\\"), F.lit("\\\\"))
    out = F.replace(out, F.lit('"'), F.lit('\\"'))
    out = F.replace(out, F.lit("\n"), F.lit("\\n"))
    out = F.replace(out, F.lit("\r"), F.lit("\\r"))
    out = F.replace(out, F.lit("\t"), F.lit("\\t"))
    return out


def ntriples_lines(
    triples: DataFrame,
    subj_col: str = "subj",
    pred_col: str = "pred",
    obj_col: str = "obj",
    entity_base: str = "urn:kg:e:",
    pred_base: str = "urn:kg:p:",
    out_col: str = "line",
) -> DataFrame:
    """Append ``out_col`` = the N-Triples serialization of each triple row."""
    line = F.concat(
        _iri(entity_base, F.col(subj_col)),
        F.lit(" "),
        _iri(pred_base, F.col(pred_col)),
        F.lit(' "'),
        escape_literal_expr(F.col(obj_col)),
        F.lit('" .'),
    )
    return triples.withColumn(out_col, line)


def void_statistics(
    triples: DataFrame,
    subj_col: str = "subj",
    pred_col: str = "pred",
    obj_col: str = "obj",
) -> DataFrame:
    """VoID dataset description (W3C VoID: void:triples, void:distinctSubjects,
    void:distinctObjects, void:propertyPartition) — the standard self-
    description every published KG ships next to its dump (the ntriples
    export above is the dump; this is its manifest).

    One row per property partition plus the ``__dataset__`` total row,
    computed in ONE pass via ROLLUP(pred): (part, n_triples,
    n_subjects, n_objects), counts over DISTINCT triples so a mirrored page
    never inflates the description.

    100 TB shape: the rollup is a map-side-combinable aggregate onto
    |preds|+1 keys over the distinct triple set; countDistinct expands per
    grouping set inside the same exchange — no second scan, no window.
    """
    facts = triples.select(
        F.col(subj_col).alias("subj"),
        F.col(pred_col).alias("pred"),
        F.col(obj_col).alias("obj"),
    ).distinct()
    return (
        facts.rollup("pred")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_triples"),
            F.countDistinct("subj").cast("long").alias("n_subjects"),
            F.countDistinct("obj").cast("long").alias("n_objects"),
        )
        .select(
            F.coalesce("pred", F.lit("__dataset__")).alias("part"),
            "n_triples",
            "n_subjects",
            "n_objects",
        )
    )


# induced literal shape → XSD range IRI (proper_name is the entity arm)
_XSD_RANGE = {
    "date": "xsd:date",
    "year": "xsd:gYear",
    "integer": "xsd:integer",
    "decimal": "xsd:decimal",
    "url": "xsd:anyURI",
    "text": "xsd:string",
}


def triple_dictionary(
    triples: DataFrame,
    subj_col: str = "subj",
    pred_col: str = "pred",
    obj_col: str = "obj",
) -> DataFrame:
    """Term dictionary for a dictionary-encoded triple store (the HDT /
    every-production-triple-store layout): each DISTINCT term across
    subject, predicate and object positions gets a DENSE integer id (0-based
    rank under lexicographic term order — deterministic, so two engines and
    two runs mint identical ids).  Output (term, id, is_subj, is_pred,
    is_obj) — the position flags let a loader build per-position dictionaries
    without re-scanning the corpus.

    At 100 TB this is the storage step that turns ~60-byte IRI strings into
    8-byte ints everywhere downstream (joins shuffle ids, not strings); the
    dense global rank uses operators/ranking.py::global_row_number — a range
    exchange + per-partition offsets, NEVER a single-partition window."""
    from aiwhispr_spark.operators.ranking import global_row_number

    terms = (
        triples.select(F.col(subj_col).alias("term"))
        .withColumn("ps", F.lit(1)).withColumn("pp", F.lit(0)).withColumn("po", F.lit(0))
        .unionByName(
            triples.select(F.col(pred_col).alias("term"))
            .withColumn("ps", F.lit(0)).withColumn("pp", F.lit(1)).withColumn("po", F.lit(0))
        )
        .unionByName(
            triples.select(F.col(obj_col).alias("term"))
            .withColumn("ps", F.lit(0)).withColumn("pp", F.lit(0)).withColumn("po", F.lit(1))
        )
        .groupBy("term")
        .agg(
            F.max("ps").cast("int").alias("is_subj"),
            F.max("pp").cast("int").alias("is_pred"),
            F.max("po").cast("int").alias("is_obj"),
        )
    )
    ranked = global_row_number(terms, [F.col("term")], rank_col="rk")
    return ranked.select(
        "term", (F.col("rk") - 1).cast("long").alias("id"), "is_subj", "is_pred", "is_obj"
    )


def encode_triples(triples: DataFrame, dictionary: DataFrame) -> DataFrame:
    """(s_id, p_id, o_id) — the triple set re-expressed over dictionary ids
    (three broadcastable joins on the term string; after this every
    downstream join/shuffle carries 24 bytes per triple)."""
    d = dictionary.select("term", "id")
    return (
        triples.join(d.withColumnsRenamed({"term": "subj", "id": "s_id"}), "subj")
        .join(d.withColumnsRenamed({"term": "pred", "id": "p_id"}), "pred")
        .join(d.withColumnsRenamed({"term": "obj", "id": "o_id"}), "obj")
        .select("s_id", "p_id", "o_id")
    )


def reify_statements(
    dated: DataFrame,
    url_col: str = "url",
    subj_col: str = "subj",
    pred_col: str = "pred",
    obj_col: str = "obj",
    qualifier_col: str = "qualifier",
    year_col: str = "year",
) -> DataFrame:
    """RDF reification of temporally-qualified facts (the W3C pattern for
    n-ary statements — Wikidata's statement nodes, RDF-star's quoted
    triples): each (subj, pred, obj, qualifier, year) becomes a STATEMENT
    NODE ``stmt_id = md5(subj|pred|obj|qualifier|year)`` with long-form
    (stmt_id, prop, value) rows — rdf:subject/predicate/object, the
    qualifier as ``kg:<qualifier>`` → year, and one ``prov:wasDerivedFrom``
    per asserting source page.  Identical assertions from many pages
    collapse onto ONE statement node carrying multi-valued provenance —
    statement-level identity is what makes qualifiers and provenance
    attachable at all.

    Scale shape: pure-JVM projection + one explode (5 rows per input fact)
    + a distinct keyed on the statement — no window, no python; stmt_id is
    content-derived so the op is embarrassingly parallel and re-runnable."""
    base = dated.select(
        F.md5(
            F.concat_ws(
                "|",
                F.col(subj_col),
                F.col(pred_col),
                F.col(obj_col),
                F.col(qualifier_col),
                F.col(year_col).cast("string"),
            )
        ).alias("stmt_id"),
        F.col(subj_col).alias("s"),
        F.col(pred_col).alias("p"),
        F.col(obj_col).alias("o"),
        F.col(qualifier_col).alias("q"),
        F.col(year_col).cast("string").alias("y"),
        F.col(url_col).alias("u"),
    )
    rows = base.select(
        "stmt_id",
        F.explode(
            F.array(
                F.struct(F.lit("rdf:subject").alias("prop"), F.col("s").alias("value")),
                F.struct(F.lit("rdf:predicate").alias("prop"), F.col("p").alias("value")),
                F.struct(F.lit("rdf:object").alias("prop"), F.col("o").alias("value")),
                F.struct(
                    F.concat(F.lit("kg:"), F.col("q")).alias("prop"),
                    F.col("y").alias("value"),
                ),
                F.struct(
                    F.lit("prov:wasDerivedFrom").alias("prop"), F.col("u").alias("value")
                ),
            )
        ).alias("r"),
    )
    return rows.select("stmt_id", "r.prop", "r.value").distinct()


def rdfs_schema_from_profile(
    triples: DataFrame,
    subj_col: str = "subj",
    pred_col: str = "pred",
    obj_col: str = "obj",
) -> DataFrame:
    """RDFS/OWL-lite schema export from the INDUCED datatype profile
    (ontology.py::infer_literal_datatypes): every predicate gets a property
    kind — ``owl:ObjectProperty`` when its dominant object shape is an
    entity mention (proper_name), else ``owl:DatatypeProperty`` — and the
    matching ``rdfs:range`` IRI from the documented XSD map.  The schema a
    mined KG publishes next to its VoID description and ntriples dump,
    derived from the data instead of hand-written.

    Output: (pred, prop_kind, range_iri, n_total, share_pm) — share_pm is
    the dominant shape's conformity so consumers see how trustworthy each
    declaration is.

    100 TB shape: everything downstream of the induction is |preds|-sized.
    """
    from aiwhispr_spark.operators.ontology import infer_literal_datatypes

    dom = infer_literal_datatypes(triples, subj_col, pred_col, obj_col).filter(
        F.col("is_dominant_i") == 1
    )
    range_iri = F.lit("rdfs:Resource")
    for shape, iri in _XSD_RANGE.items():
        range_iri = F.when(F.col("dtype") == shape, F.lit(iri)).otherwise(range_iri)
    return dom.select(
        "pred",
        F.when(F.col("dtype") == "proper_name", F.lit("owl:ObjectProperty"))
        .otherwise(F.lit("owl:DatatypeProperty"))
        .alias("prop_kind"),
        range_iri.alias("range_iri"),
        "n_total",
        "share_pm",
    )


def rdf_list_unroll(
    triples: DataFrame,
    head_pred: str = "hasList",
    first_pred: str = "rdf:first",
    rest_pred: str = "rdf:rest",
    nil: str = "rdf:nil",
    max_len: int = 16,
    subj_col: str = "subj",
    pred_col: str = "pred",
    obj_col: str = "obj",
) -> DataFrame:
    """Reconstruct ordered RDF collections (rdf:first/rdf:rest chains).

    RDF 1.1 lists are cons cells: owner --head_pred--> cell0,
    cell --rdf:first--> item, cell --rdf:rest--> next cell | rdf:nil.
    Triple stores hold them shredded; consumers need (owner, idx, item)
    back in order.  This walks the chain breadth-parallel: every list
    advances one cell per round, so the round count is the MAX list
    length, bounded by ``max_len`` (the kg_scc_bounded contract — the
    bound is part of the operator's semantics, and real-world schema
    lists are short).  Cycles and overlong chains stop at the bound
    instead of looping; truncation is observable as a missing rdf:nil
    terminator, not silent data loss.

    Each round is one join of the (shrinking) frontier against the two
    cell maps on the cell id — at 100 TB both maps are the same
    subj-keyed exchange reused every round, the frontier only ever
    shrinks, and per-round persist caps lineage (rounds are joins off
    the SAME persisted parents, so depth stays linear; no 3-way blowup).

    Output: (owner, idx, item) with idx 0-based.
    """
    s, p, o = F.col(subj_col), F.col(pred_col), F.col(obj_col)
    firsts = triples.filter(p == first_pred).select(
        s.alias("cell"), o.alias("item")
    )
    rests = triples.filter(p == rest_pred).select(
        s.alias("cell"), o.alias("nxt")
    )
    firsts.persist()
    rests.persist()
    frontier = triples.filter(p == head_pred).select(
        s.alias("owner"), o.alias("cell")
    )
    out = []
    for idx in range(max_len):
        frontier = frontier.persist()
        if frontier.rdd.isEmpty():
            break
        out.append(
            frontier.join(firsts, "cell").select(
                "owner", F.lit(idx).cast("long").alias("idx"), "item"
            )
        )
        nxt = frontier.join(rests, "cell").filter(F.col("nxt") != nil)
        prev = frontier
        frontier = nxt.select("owner", F.col("nxt").alias("cell"))
        frontier = frontier.localCheckpoint(eager=True)
        prev.unpersist()
    firsts.unpersist()
    rests.unpersist()
    if not out:
        return triples.sparkSession.createDataFrame(
            [], "owner string, idx long, item string"
        )
    res = out[0]
    for d in out[1:]:
        res = res.unionByName(d)
    return res
