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
