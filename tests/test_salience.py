"""Entity salience (operators/salience.py): formula exactness, rank
tie-breaks, doc-partitioned window.  The hash-value gate lives in
__spark_entry__ (entity_salience vs the gazetteer-composed DuckDB oracle)."""

from __future__ import annotations

from aiwhispr_spark.operators.salience import entity_salience


def _matches(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, pos int, surface string, etype string")


def test_salience_formula_and_rank(spark):
    m = _matches(
        spark,
        [
            (1, 1, "acme", "org"),    # n=2, first=1 -> 2_000_000 div 10 = 200000
            (1, 50, "acme", "org"),
            (1, 3, "berlin", "loc"),  # n=1, first=3 -> 1_000_000 div 12 = 83333
        ],
    )
    rows = {r.surface: (r.salience_i, r.rk) for r in entity_salience(m).collect()}
    assert rows == {"acme": (200000, 1), "berlin": (83333, 2)}


def test_rank_tiebreak_on_surface(spark):
    m = _matches(spark, [(1, 5, "bbb", "org"), (1, 5, "aaa", "org")])
    rows = {r.surface: r.rk for r in entity_salience(m).collect()}
    assert rows == {"aaa": 1, "bbb": 2}


def test_window_is_doc_partitioned(spark):
    m = _matches(spark, [(1, 1, "a", "x"), (2, 1, "a", "x")])
    df = entity_salience(m)
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Window" in plan
    # the rank exchange keys on doc_id, not a single global partition
    assert "SinglePartition" not in plan
