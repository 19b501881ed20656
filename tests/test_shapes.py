"""SHACL-lite validation (operators/shapes.py): each violation kind on a
hand-built graph, untyped-subject skip, strict untyped-object range
semantics, and the broadcast plan shape.  The hash-value gate lives in
__spark_entry__ (kg_shacl_violations vs a closed-form DuckDB oracle)."""

from __future__ import annotations

from pyspark.sql import functions as F

from aiwhispr_spark.operators.shapes import shape_violations


def _fixture(spark):
    triples = spark.createDataFrame(
        [
            # ok person: one employer, one email
            ("p_ok", "works_for", "c1"),
            ("p_ok", "email", "x@y"),
            # two employers -> max_count; no email -> min_count
            ("p_two", "works_for", "c1"),
            ("p_two", "works_for", "c2"),
            # employer typed place + employer untyped -> class_range 2
            ("p_bad", "works_for", "t1"),
            ("p_bad", "works_for", "mystery"),
            ("p_bad", "email", "a@b"),
            # undeclared predicate -> closed
            ("p_ok", "nickname", "ace"),
            # untyped subject: judged by nothing
            ("ghost", "works_for", "c1"),
        ],
        "subj string, pred string, obj string",
    )
    types = spark.createDataFrame(
        [
            ("p_ok", "person"),
            ("p_two", "person"),
            ("p_bad", "person"),
            ("c1", "org"),
            ("c2", "org"),
            ("t1", "place"),
        ],
        "entity string, etype string",
    )
    shapes = spark.createDataFrame(
        [
            ("person", "works_for", 1, 1, "org"),
            ("person", "email", 1, None, None),
        ],
        "etype string, pred string, min_count int, max_count int, obj_etype string",
    )
    return triples, types, shapes


def test_every_violation_kind_and_untyped_subject_skip(spark):
    triples, types, shapes = _fixture(spark)
    got = {
        (r.subj, r.etype, r.pred, r.violation, r.observed)
        for r in shape_violations(triples, types, shapes).collect()
    }
    assert got == {
        ("p_two", "person", "works_for", "max_count", 2),
        ("p_two", "person", "email", "min_count", 0),
        # both the place-typed and the UNTYPED employer violate the range
        ("p_bad", "person", "works_for", "class_range", 2),
        ("p_bad", "person", "works_for", "max_count", 2),
        ("p_ok", "person", "nickname", "closed", 1),
    }
    # "ghost" appears nowhere: untyped subjects are out of scope
    assert not any(s == "ghost" for s, *_ in got)


def test_clean_graph_yields_nothing(spark):
    triples = spark.createDataFrame(
        [("p1", "works_for", "c1"), ("p1", "email", "x@y")],
        "subj string, pred string, obj string",
    )
    types = spark.createDataFrame(
        [("p1", "person"), ("c1", "org")], "entity string, etype string"
    )
    shapes = spark.createDataFrame(
        [("person", "works_for", 1, 1, "org"), ("person", "email", 1, None, None)],
        "etype string, pred string, min_count int, max_count int, obj_etype string",
    )
    assert shape_violations(triples, types, shapes).count() == 0


def test_multi_typed_object_conforms_when_any_type_matches(spark):
    # 'acme' is both org and company; the shape wants org — conforming,
    # and the extra type must not fan out into a class_range violation
    triples = spark.createDataFrame(
        [("p1", "works_for", "acme"), ("p1", "email", "x@y")],
        "subj string, pred string, obj string",
    )
    types = spark.createDataFrame(
        [("p1", "person"), ("acme", "org"), ("acme", "company")],
        "entity string, etype string",
    )
    shapes = spark.createDataFrame(
        [("person", "works_for", 1, 1, "org"), ("person", "email", 1, None, None)],
        "etype string, pred string, min_count int, max_count int, obj_etype string",
    )
    assert shape_violations(triples, types, shapes).count() == 0


def test_shapes_catalog_is_broadcast(spark):
    triples, types, shapes = _fixture(spark)
    plan = (
        shape_violations(triples, types, shapes)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan and "PythonUDF" not in plan
