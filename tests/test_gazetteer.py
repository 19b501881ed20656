"""Gazetteer tagging (operators/gazetteer.py): longest-match-wins coverage
cut, position arithmetic, and the broadcast/anti-join plan shape."""

from __future__ import annotations

from aiwhispr_spark.operators.gazetteer import gazetteer_doc_summary, tag_gazetteer

GAZ = [
    ("table hash", "STRUCT"),
    ("hash", "ALGO"),
    ("table", "DS"),
    ("spark", "SYS"),
]


def _tag(spark, text):
    docs = spark.createDataFrame([(1, text)], "doc_id long, text string")
    gaz = spark.createDataFrame(GAZ, "surface string, etype string")
    return sorted(
        (r.pos, r.surface, r.etype) for r in tag_gazetteer(docs, gaz).collect()
    )


def test_longest_match_consumes_both_positions(spark):
    # 'table hash' covers positions 2 and 3: neither 'table'@2 nor 'hash'@3
    # may fire; 'hash'@5 is uncovered and fires
    got = _tag(spark, "spark table hash then hash")
    assert got == [(1, "spark", "SYS"), (2, "table hash", "STRUCT"), (5, "hash", "ALGO")]


def test_adjacent_bigrams_both_fire(spark):
    # overlapping occurrences: 'table hash' at 1 and 3 -> both reported,
    # 'hash'@2? no ('hash' is pos 2 only as part of first bigram)
    got = _tag(spark, "table hash table hash")
    assert got == [(1, "table hash", "STRUCT"), (3, "table hash", "STRUCT")]


def test_case_and_summary(spark):
    got = _tag(spark, "Spark SPARK spark")
    assert got == [(1, "spark", "SYS"), (2, "spark", "SYS"), (3, "spark", "SYS")]
    docs = spark.createDataFrame([(7, "spark x spark")], "doc_id long, text string")
    gaz = spark.createDataFrame(GAZ, "surface string, etype string")
    (row,) = gazetteer_doc_summary(tag_gazetteer(docs, gaz)).collect()
    assert (row.doc_id, row.surface, row.n_hits, row.first_pos) == (7, "spark", 2, 1)


def test_empty_and_no_match(spark):
    assert _tag(spark, "   ") == []
    assert _tag(spark, "nothing matches here") == []
