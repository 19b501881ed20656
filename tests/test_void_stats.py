"""VoID dataset statistics (operators/rdf.py::void_statistics): rollup
shape, distinct-triple counting, dataset-total row.  The hash-value gate
lives in __spark_entry__ (kg_void_stats over the real E1-E3 triples)."""

from __future__ import annotations

from aiwhispr_spark.operators.rdf import void_statistics


def test_partitions_and_dataset_total(spark):
    rows = [
        ("A", "p", "X"), ("A", "p", "X"),  # duplicate fact counts once
        ("A", "p", "Y"), ("B", "p", "X"),
        ("A", "q", "X"),
    ]
    df = spark.createDataFrame(rows, "subj string, pred string, obj string")
    got = {r.part: (r.n_triples, r.n_subjects, r.n_objects)
           for r in void_statistics(df).collect()}
    assert got == {
        "p": (3, 2, 2),
        "q": (1, 1, 1),
        "__dataset__": (4, 2, 2),
    }


def test_rdfs_schema_declarations(spark):
    from aiwhispr_spark.operators.rdf import rdfs_schema_from_profile

    rows = [
        ("S1", "ceo", "Ada Byron"), ("S2", "ceo", "Eve Null"),
        ("S1", "founded_in", "1994"), ("S2", "founded_in", "circa 1901"),
        ("S3", "founded_in", "2001"),
    ]
    df = spark.createDataFrame(rows, "subj string, pred string, obj string")
    got = {r.pred: (r.prop_kind, r.range_iri, r.n_total, r.share_pm)
           for r in rdfs_schema_from_profile(df).collect()}
    assert got["ceo"] == ("owl:ObjectProperty", "rdfs:Resource", 2, 1000)
    assert got["founded_in"] == ("owl:DatatypeProperty", "xsd:gYear", 3, 666)
