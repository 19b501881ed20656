"""Gates for l-diversity, Benford audit, and unit normalization:

* l-diversity — hand-built classes: a k-anonymous-but-homogeneous class must
  fail BOTH verdicts (the homogeneity attack k-anonymity misses); a uniform
  3-value class passes both; entropy_mi matches the exact closed form;
* Benford — digit spine completeness at zero counts, first-digit extraction,
  empty input emits 0 (never NULL) obs_mi;
* units — exact rational factors (mi/lb definitions), unknown units visible
  with the −1 sentinel, other columns carried through.
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from aiwhispr_spark.operators.literals import benford_first_digit_audit, normalize_units
from aiwhispr_spark.operators.pii import l_diversity_audit


def test_l_diversity_homogeneous_class_fails(spark):
    rows = [("en", "a", 1)] * 6 + [("en", "b", v) for v in (1, 2, 3, 1, 2, 3)]
    df = spark.createDataFrame(rows, "lang string, source string, sens long")
    got = {(r["lang"], r["source"]): r for r in l_diversity_audit(df, ["lang", "source"], "sens", l=3).collect()}
    homog = got[("en", "a")]
    assert (homog["n_distinct"], homog["distinct_l_ok"], homog["entropy_l_ok"]) == (1, 0, 0)
    assert homog["entropy_mi"] == 0  # single value: entropy exactly 0
    div = got[("en", "b")]
    assert (div["n_distinct"], div["distinct_l_ok"], div["entropy_l_ok"]) == (3, 1, 1)
    # uniform over 3 values: entropy = ln 3; per-value term round(1e6·ln 3)
    assert div["entropy_mi"] == round(1_000_000 * math.log(3))


def test_benford_spine_and_extraction(spark):
    df = spark.createDataFrame(
        [(123,), (19,), (1,), (900,), (0,), (-5,)], "v long"
    )  # digits: 1,1,1,9 ; 0 and -5 excluded
    got = {r["digit"]: r for r in benford_first_digit_audit(df, "v").collect()}
    assert sorted(got) == list(range(1, 10))
    assert got[1]["n_obs"] == 3 and got[9]["n_obs"] == 1
    assert got[1]["obs_mi"] == 750_000 and got[9]["obs_mi"] == 250_000
    assert got[2]["n_obs"] == 0 and got[2]["obs_mi"] == 0
    assert got[1]["exp_mi"] == round(1_000_000 * math.log10(2))


def test_benford_empty_input_all_zero(spark):
    df = spark.createDataFrame([(0,)], "v long")
    rows = benford_first_digit_audit(df, "v").collect()
    assert len(rows) == 9
    assert all(r["n_obs"] == 0 and r["obs_mi"] == 0 for r in rows)


def test_normalize_units_exact_and_sentinel(spark):
    df = spark.createDataFrame(
        [(1, "mi", 10_000), (2, "lb", 20_000), (3, "cm", 250), (4, "parsec", 7)],
        "mid long, unit string, value_i long",
    )
    got = {r["mid"]: r for r in normalize_units(df).collect()}
    # 1 mi (value 1.0000 scaled 1e4) = 1609.344 m -> 10000*1609344//1000
    assert got[1]["norm_value_i"] == 16_093_440 and got[1]["canonical_unit"] == "m"
    # 2 lb = 907.18474 g -> 20000*45359237//100000 = 9071847 (floor documented)
    assert got[2]["norm_value_i"] == 9_071_847 and got[2]["dimension"] == "mass"
    assert got[3]["norm_value_i"] == 2  # 250//100: floor div is the contract
    assert got[4]["dimension"] == "unknown" and got[4]["norm_value_i"] == -1
    assert got[4]["unit"] == "parsec"  # unknown rows stay visible


def test_extract_measurements_alternation_and_decoy(spark):
    from aiwhispr_spark.operators.literals import extract_measurements

    df = spark.createDataFrame(
        [
            (1, "Box1 weighs 12.5 km of rope"),  # km must not stop at 'm'
            (2, "Crate measures 7 m wide"),
            (3, "Decoy weighs fast units"),  # no number: no match
            (4, "pallet spans 3.25 mi easily"),
            (5, "Thing weighs 9 furlong"),  # unit outside alternation
        ],
        "doc_id long, text string",
    )
    got = {r["id"]: r for r in extract_measurements(df).collect()}
    assert got[1]["unit"] == "km" and got[1]["value_i"] == 125_000
    assert got[2]["unit"] == "m" and got[2]["value_i"] == 70_000
    assert got[4]["subj"] == "pallet" and got[4]["value_i"] == 32_500
    assert 3 not in got and 5 not in got
