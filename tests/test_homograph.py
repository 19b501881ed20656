"""Confusable-skeleton homograph detection (operators/unicodenorm.py):
Cyrillic/Greek folds, uppercase-through-capital mapping, spoof flag
semantics, distinct-name idempotence.  The hash-value gate lives in
__spark_entry__ (homograph_spoof_pairs vs closed-form Cyrillic literals)."""

from __future__ import annotations

from pyspark.sql import functions as F

from aiwhispr_spark.operators.unicodenorm import (
    confusable_skeleton_expr,
    homograph_pairs,
)


def test_skeleton_folds_cyrillic_and_greek_through_case(spark):
    cases = {
        "асmе": "acme",      # Cyrillic а/с/е
        "РАУРАL": "paypal",  # Cyrillic uppercase Р/А/У
        "Βeta": "beta",      # Greek capital Beta
        "plain": "plain",    # untouched
    }
    df = spark.createDataFrame([(v,) for v in cases], "v string")
    got = {
        r.v: r.s
        for r in df.select(
            "v", confusable_skeleton_expr(F.col("v")).alias("s")
        ).collect()
    }
    assert got == cases


def test_pairs_flag_cross_script_spoofs_only(spark):
    df = spark.createDataFrame(
        [("acme",), ("асme",), ("аcmе",), ("other",), ("acme",)], "name string"
    )
    got = {
        (r.a, r.b): r.is_spoof_i for r in homograph_pairs(df).collect()
    }
    # ascii vs either Cyrillic variant -> spoof; Cyrillic vs Cyrillic -> not
    assert got[("acme", "асme")] == 1
    assert got[("acme", "аcmе")] == 1
    assert got[("аcmе", "асme")] == 0
    assert len(got) == 3  # duplicate 'acme' row counted once, 'other' silent
