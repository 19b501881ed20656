"""Reliability-weighted fact confidence (operators/temporal.py::
fact_confidence): trustworthy-host weighting, one-vote-per-host dedup (the
upstream majority sees raw observations; the confidence ballot does not),
hand-computed shares.  The hash-value gate lives in __spark_entry__
(kg_fact_confidence over the conflict fixture)."""

from __future__ import annotations

from aiwhispr_spark.operators.temporal import fact_confidence


def _conf(spark, rows):
    df = spark.createDataFrame(
        rows, "host string, subj string, pred string, obj string"
    )
    return {
        (r.subj, r.pred, r.obj): (r.n_hosts, r.support_i, r.confidence_pm)
        for r in fact_confidence(df).collect()
    }


def test_reliable_hosts_outweigh_spam_and_votes_dedup_per_host(spark):
    rows = [
        # three good hosts assert Ada once each (ties 3-3 with spam's
        # repeats; obj ASC tie-break keeps Ada the majority)
        ("g1", "E", "ceo", "Ada"), ("g2", "E", "ceo", "Ada"),
        ("g3", "E", "ceo", "Ada"),
        ("g1", "F", "hq", "Berlin"), ("g2", "F", "hq", "Berlin"),
        ("g3", "F", "hq", "Berlin"),
        # spam repeats the minority object 3x from ONE host, agrees once
        ("spam", "E", "ceo", "Eve"), ("spam", "E", "ceo", "Eve"),
        ("spam", "E", "ceo", "Eve"),
        ("spam", "F", "hq", "Berlin"),
    ]
    got = _conf(spark, rows)
    # good hosts: 2/2 agreement -> reliability 1e6 each
    assert got[("E", "ceo", "Ada")] == (3, 3000000, 1000)
    # spam: 1/4 agreement -> 250000; its 3 repeats are ONE ballot
    assert got[("E", "ceo", "Eve")] == (1, 250000, 250)
    # Berlin: 3 good + spam -> 3.25e6 over 4 hosts
    assert got[("F", "hq", "Berlin")] == (4, 3250000, 812)
