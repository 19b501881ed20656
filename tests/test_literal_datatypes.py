"""Literal range-datatype induction (operators/ontology.py::
infer_literal_datatypes): rule precedence (date before year before integer),
proper-name shape, distinct-fact counting, dominance/share math.  The
hash-value gate lives in __spark_entry__ (kg_literal_datatypes vs a
closed-form six-predicate oracle)."""

from __future__ import annotations

from pyspark.sql import functions as F

from aiwhispr_spark.operators.ontology import (
    infer_literal_datatypes,
    literal_dtype_expr,
)


def test_rule_precedence_first_match_wins(spark):
    cases = {
        "2020-05-07": "date",
        "1994": "year",
        "2099": "year",
        "2150": "integer",  # out of year range
        "-42": "integer",
        "3.14": "decimal",
        "https://x.org/a": "url",
        "Ada Byron 3": "proper_name",
        "circa 1994": "text",
        "": "text",
    }
    df = spark.createDataFrame([(v,) for v in cases], "v string")
    got = {
        r.v: r.t
        for r in df.select("v", literal_dtype_expr(F.col("v")).alias("t")).collect()
    }
    assert got == cases


def test_dominance_share_and_distinct_facts(spark):
    rows = (
        [("S%d" % i, "founded_in", "1994") for i in range(3)]
        + [("S0", "founded_in", "1994")]  # duplicate fact: counts once
        + [("S9", "founded_in", "circa 1994")]
    )
    df = spark.createDataFrame(rows, "subj string, pred string, obj string")
    got = {
        r.dtype: (r.n_values, r.n_total, r.share_pm, r.is_dominant_i)
        for r in infer_literal_datatypes(df).collect()
    }
    assert got == {
        "year": (3, 4, 750, 1),
        "text": (1, 4, 250, 0),
    }


def test_enforcement_flags_deviants_against_dominant(spark):
    from aiwhispr_spark.operators.ontology import apply_datatype_constraints

    rows = [
        ("S1", "founded_in", "1994"),
        ("S2", "founded_in", "2001"),
        ("S3", "founded_in", "circa 1994"),
    ]
    df = spark.createDataFrame(rows, "subj string, pred string, obj string")
    got = {r.subj: (r.dtype, r.exp_dtype, r.conforms_i)
           for r in apply_datatype_constraints(df).collect()}
    assert got["S1"] == ("year", "year", 1)
    assert got["S3"] == ("text", "year", 0)
