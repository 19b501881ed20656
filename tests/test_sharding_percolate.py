"""Rendezvous sharding (operators/sharding.py) and percolate reverse search
(operators/fulltext.py).  Value gates live in __spark_entry__
(url_rendezvous_shards / percolate_matches vs closed-form oracles); here we
pin the properties the oracles can't see: HRW minimal churn on shard
removal, and the percolate plan shape."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from aiwhispr_spark.operators.fulltext import percolate_conjunctive
from aiwhispr_spark.operators.sharding import rendezvous_assign, rendezvous_expr


def _keys(spark, n=200):
    return spark.range(n).select(
        F.concat(F.lit("https://k"), F.col("id").cast("string")).alias("url")
    )


def test_rendezvous_minimal_churn_on_shard_removal(spark):
    keys = _keys(spark)
    full = {r.url: r.shard for r in rendezvous_assign(keys, ["a", "b", "c", "d"]).collect()}
    # every shard should win SOMETHING at n=200
    assert set(full.values()) == {"a", "b", "c", "d"}
    reduced = {
        r.url: r.shard for r in rendezvous_assign(keys, ["a", "b", "c"]).collect()
    }
    for url, s in full.items():
        if s != "d":
            # THE rendezvous property: keys not on the removed shard never move
            assert reduced[url] == s
        else:
            assert reduced[url] in {"a", "b", "c"}


def test_rendezvous_ignores_shard_list_order_and_dups(spark):
    keys = _keys(spark, 50)
    a = rendezvous_assign(keys, ["b", "a", "c"]).collect()
    b = rendezvous_assign(keys, ["a", "c", "b", "a"]).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_rendezvous_rejects_empty_fleet():
    with pytest.raises(ValueError):
        rendezvous_expr(F.lit("x"), [])


def test_rendezvous_null_key_yields_null_shard(spark):
    # a NULL key must NOT silently pile onto the lexicographically last
    # shard (the all-NULL-weight tie fallback) — it stays NULL and visible
    df = spark.createDataFrame([("https://k1",), (None,)], "url string")
    rows = {r.url: r.shard for r in rendezvous_assign(df, ["a", "b", "z"]).collect()}
    assert rows["https://k1"] is not None
    assert rows[None] is None


def test_rendezvous_is_pure_jvm_no_exchange(spark):
    plan = (
        rendezvous_assign(_keys(spark), ["a", "b", "c"])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan and "PythonUDF" not in plan


def test_percolate_conjunctive_semantics(spark):
    docs = spark.createDataFrame(
        [
            (1, "the cat sat on the mat"),
            (2, "the dog sat"),
            (3, ""),
        ],
        "doc_id long, text string",
    )
    queries = spark.createDataFrame(
        [
            ("both", "cat mat"),
            ("any-doc", "sat"),
            ("dup-terms", "the the sat"),
            ("miss", "cat dog"),
            ("casefold", "CAT Mat"),
            ("vacuous-empty", ""),
            ("vacuous-ws", "   "),
            ("vacuous-null", None),
        ],
        "query_id string, query string",
    )
    got = {
        (r.id, r.query_id) for r in percolate_conjunctive(docs, queries).collect()
    }
    # token-less queries are vacuous conjunctions: they match EVERY doc
    vacuous = {
        (d, q)
        for d in (1, 2, 3)
        for q in ("vacuous-empty", "vacuous-ws", "vacuous-null")
    }
    assert got == {
        (1, "both"),
        (1, "any-doc"),
        (2, "any-doc"),
        (1, "dup-terms"),
        (2, "dup-terms"),
        (1, "casefold"),
    } | vacuous


def test_percolate_broadcasts_registry(spark):
    docs = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    queries = spark.createDataFrame([("q", "a b")], "query_id string, query string")
    plan = (
        percolate_conjunctive(docs, queries)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan
