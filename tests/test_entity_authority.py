"""Authority-weighted mentions (operators/salience.py::
authority_weighted_mentions): hub-vs-spam ordering, unranked-host zero
contribution, distinct-host counting.  The hash-value gate lives in
__spark_entry__ (entity_authority composed over the real pagerank chain)."""

from __future__ import annotations

from aiwhispr_spark.operators.salience import authority_weighted_mentions


def _auth(spark, mentions, ranks):
    m = spark.createDataFrame(mentions, "url string, entity string")
    r = spark.createDataFrame(ranks, "node string, pr_i bigint")
    return {
        x.entity: (x.n_mentions, x.n_hosts, x.authority_i)
        for x in authority_weighted_mentions(m, r).collect()
    }


def test_one_hub_mention_outranks_spam_farm(spark):
    mentions = [("https://hub.org/p", "A")] + [
        (f"https://spam{j}.net/p", "B") for j in range(5)
    ]
    ranks = [("hub.org", 900000)] + [(f"spam{j}.net", 10000) for j in range(5)]
    got = _auth(spark, mentions, ranks)
    assert got["A"] == (1, 1, 900000)
    assert got["B"] == (5, 5, 50000)
    assert got["A"][2] > got["B"][2]


def test_unranked_host_counts_but_adds_zero(spark):
    mentions = [("https://known.org/p", "A"), ("https://ghost.org/p", "A")]
    ranks = [("known.org", 123456)]
    got = _auth(spark, mentions, ranks)
    assert got["A"] == (2, 2, 123456)
