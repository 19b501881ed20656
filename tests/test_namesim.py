"""Jaro-Winkler comparator (operators/namesim.py): classic textbook values,
the DuckDB byte/boost semantics pins, and blocked candidate generation ≡
exhaustive scoring above threshold (for prefix-sharing corpora).  The
cross-engine gate lives in __spark_entry__ (jaro_winkler_scores vs DuckDB's
independent implementation)."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from aiwhispr_spark.operators.namesim import (
    blocked_name_matches,
    jaro_winkler,
    jw_i,
)


@pytest.mark.parametrize(
    "a,b,exp",
    [
        ("MARTHA", "MARHTA", 0.961111),
        ("DIXON", "DICKSONX", 0.813333),
        ("JELLYFISH", "SMELLYFISH", 0.896296),  # no shared prefix, no boost
        ("abc", "abc", 1.0),
        ("abc", "", 0.0),
        ("", "", 0.0),  # DuckDB convention: two empties score 0
        ("ab", "ba", 0.0),  # window 0: adjacent transposition can't match
        ("aaxxxxxx", "aayyyy", 0.527778),  # jaro ≤ 0.7: boost suppressed
        ("aaaa", "aaaaaaaaaa", 0.88),  # prefix boost capped at 4
    ],
)
def test_textbook_values(a, b, exp):
    assert jaro_winkler(a, b) == pytest.approx(exp, abs=1e-6)


def test_byte_semantics_match_duckdb_on_multibyte():
    con = duckdb.connect()
    for a, b in [("é中ü", "é中x"), ("naïve", "naive"), ("中中中", "中中x")]:
        exp = con.execute(
            "SELECT jaro_winkler_similarity(?, ?)", [a, b]
        ).fetchone()[0]
        assert jaro_winkler(a, b) == pytest.approx(exp, abs=1e-12)


def test_blocked_matches_equal_exhaustive_for_prefix_corpus(spark):
    names = [
        (1, "Acme Corporation"),
        (2, "Acme Corporatoin"),
        (3, "Acme Corp"),
        (4, "Zenith Widgets"),
        (5, "Zenith Widgets Inc"),
        (6, "Globex"),
    ]
    df = spark.createDataFrame(names, "id long, name string")
    got = {
        (r.id_a, r.id_b)
        for r in blocked_name_matches(df, df, threshold=0.9).collect()
        if r.id_a < r.id_b
    }
    # exhaustive cross-join reference over the same comparator
    ex = df.alias("a").crossJoin(df.alias("b")).select(
        F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"),
        jw_i(F.col("a.name"), F.col("b.name")).alias("s"),
    )
    exp = {
        (r.id_a, r.id_b)
        for r in ex.filter((F.col("s") >= 9000) & (F.col("id_a") < F.col("id_b"))).collect()
    }
    assert got == exp
    assert (1, 2) in got and (1, 3) in got and (4, 5) in got
    assert not any(6 in p for p in got)


def test_blocked_matches_python_sees_candidates_not_all_pairs(spark):
    # the block-key join must run BEFORE the python comparator: in the
    # top-down plan print the ArrowEvalPython stage (applied to post-join
    # candidates) appears ABOVE the join operator
    df = spark.createDataFrame([(1, "aa x"), (2, "zz y")], "id long, name string")
    plan = (
        blocked_name_matches(df, df)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "ArrowEvalPython" in plan and "Join" in plan
    assert plan.index("ArrowEvalPython") < plan.index("Join")
