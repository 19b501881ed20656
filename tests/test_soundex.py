"""Soundex semantics (namesim.py::soundex_expr/phonetic_blocks): NARA
examples, H/W transparency, builtin cross-check, blocking output."""

from __future__ import annotations

from pyspark.sql import functions as F

NARA = [
    ("Ashcraft", "A261"),   # H transparent: C after SH collapses with S? no —
    ("Ashcroft", "A261"),   # ...S,C adjacent through H code to 26, not 226
    ("Tymczak", "T522"),
    ("Pfister", "P236"),    # leading P,F same code collapse
    ("Honeyman", "H555"),
    ("Lee", "L000"),
    ("VanDeusen", "V532"),
    ("Washington", "W252"),
    ("Gutierrez", "G362"),
    ("Jackson", "J250"),
    ("Robert", "R163"),
    ("Rupert", "R163"),
    ("Wu", "W000"),
]


def test_soundex_nara_examples_and_builtin_agreement(spark):
    from aiwhispr_spark.operators.namesim import soundex_expr

    df = spark.createDataFrame([(n,) for n, _ in NARA], "name string")
    out = df.select(
        "name",
        soundex_expr(F.col("name")).alias("sx"),
        F.soundex(F.col("name")).alias("builtin"),
    ).collect()
    got = {r.name: r.sx for r in out}
    for n, exp in NARA:
        assert got[n] == exp, (n, got[n], exp)
    # the expression chain agrees with Spark's JVM soundex on every case
    for r in out:
        assert r.sx == r.builtin, (r.name, r.sx, r.builtin)


def test_soundex_non_alpha_and_empty(spark):
    from aiwhispr_spark.operators.namesim import soundex_expr

    df = spark.createDataFrame(
        [("O'Brien",), ("  ",), ("123",)], "name string"
    )
    got = {r.name: r.sx for r in df.select(
        "name", soundex_expr(F.col("name")).alias("sx")).collect()}
    assert got["O'Brien"] == "O165"
    assert got["  "] == "" and got["123"] == ""


def test_phonetic_blocks_group_variants(spark):
    from aiwhispr_spark.operators.namesim import phonetic_blocks

    names = spark.createDataFrame(
        [("Smith",), ("Smyth",), ("Smith",), ("Jones",)], "name string"
    )
    rows = phonetic_blocks(names).collect()
    assert len(rows) == 1
    assert rows[0].soundex == "S530"
    assert rows[0].members == "Smith,Smyth" and rows[0].n_names == 2
