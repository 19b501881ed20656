"""Unit gates for PII redaction (operators/pii.py) and temperature mixing
(operators/mixing.py); the sf-scale value gates are `pii_redact` and
`temperature_mix_sample` in __spark_entry__.py."""

import pytest
from pyspark.sql import functions as F

from aiwhispr_spark.operators.mixing import source_rates, temperature_sample
from aiwhispr_spark.operators.pii import pii_counts_expr, redact_pii_expr


def _redact(spark, s: str) -> str:
    return (
        spark.createDataFrame([(s,)], "t string")
        .select(redact_pii_expr(F.col("t")).alias("r"))
        .first()
        .r
    )


def test_redacts_each_type(spark):
    assert (
        _redact(spark, "mail a.b+c@ex-1.org, ip 10.0.255.7, tel +44 123 4567.")
        == "mail <EMAIL>, ip <IP>, tel <PHONE>."
    )


def test_leaves_clean_text_and_near_misses(spark):
    s = "version 1.2.3 costs $5, release 10.0.255 (three octets), a@b (no tld)."
    assert _redact(spark, s) == s


def test_counts_follow_chain_order(spark):
    # the phone count runs on post-ip-masked text: an IP is never recounted
    # as a phone fragment, and multiple matches per type all count
    row = (
        spark.createDataFrame(
            [("x@y.io and z@w.dev from 8.8.8.8 call +1-555-0001 or +1-555-0002",)],
            "t string",
        )
        .select(
            *(
                c.alias(n)
                for c, n in zip(pii_counts_expr(F.col("t")), ["e", "i", "p"])
            )
        )
        .first()
    )
    assert (row.e, row.i, row.p) == (2, 1, 2)


def _docs(spark):
    # 100 'big', 40 'mid', 10 'small'
    rows = [
        (i, "big" if i < 100 else ("mid" if i < 140 else "small"))
        for i in range(150)
    ]
    return spark.createDataFrame(rows, "doc_id long, source string")


def test_rates_boost_small_sources_and_cap(spark):
    rates = {r.source: r.rate_i for r in source_rates(_docs(spark)).collect()}
    assert rates["big"] == 500000  # head source sampled at exactly base_frac
    assert rates["big"] < rates["mid"] < rates["small"]
    assert rates["small"] == 1000000  # 0.5*sqrt(10) > 1 → capped: keep all
    assert rates["mid"] == round(0.5 * (100 / 40) ** 0.5 * 1e6)


def test_sample_deterministic_and_complete_under_cap(spark):
    out1 = sorted(r.doc_id for r in temperature_sample(_docs(spark)).collect())
    out2 = sorted(r.doc_id for r in temperature_sample(_docs(spark)).collect())
    assert out1 == out2  # content-addressed, not rng-state-addressed
    kept_small = [i for i in out1 if i >= 140]
    assert kept_small == list(range(140, 150))  # rate 1e6 keeps every doc
    n_big = sum(1 for i in out1 if i < 100)
    assert 30 <= n_big <= 70  # ~50 expected at rate 0.5


def test_alpha_one_is_uniform_rate(spark):
    rates = {
        r.source: r.rate_i
        for r in source_rates(_docs(spark), alpha=1.0, base_frac=0.25).collect()
    }
    assert set(rates.values()) == {250000}  # natural proportions, no boost


def test_weighted_sample_prefers_heavy_but_not_deterministically_top(spark):
    from aiwhispr_spark.operators.mixing import weighted_sample_without_replacement

    # one source, weights 1 for ids 0..79 and 1000 for ids 80..99: the
    # heavy docs should dominate the k=10 draw without being a pure top-k
    rows = [(i, "s", 1 if i < 80 else 1000) for i in range(100)]
    df = spark.createDataFrame(rows, "doc_id long, source string, w long")
    out = weighted_sample_without_replacement(df, k=10, weight_col="w")
    picked = sorted(r.doc_id for r in out.collect())
    assert len(picked) == 10
    heavy = sum(1 for i in picked if i >= 80)
    assert heavy >= 7  # 20 heavy docs at 1000x weight dominate the draw


def test_weighted_sample_deterministic_and_seed_sensitive(spark):
    from aiwhispr_spark.operators.mixing import weighted_sample_without_replacement

    rows = [(i, "s", i + 1) for i in range(60)]
    df = spark.createDataFrame(rows, "doc_id long, source string, w long")
    a = sorted(r.doc_id for r in weighted_sample_without_replacement(df, 8, "w").collect())
    b = sorted(r.doc_id for r in weighted_sample_without_replacement(df, 8, "w").collect())
    c = sorted(
        r.doc_id
        for r in weighted_sample_without_replacement(df, 8, "w", seed="es2").collect()
    )
    assert a == b  # content-addressed rerun stability
    assert a != c  # the seed actually enters the priorities


def test_weighted_sample_drops_nonpositive_weights(spark):
    from aiwhispr_spark.operators.mixing import weighted_sample_without_replacement

    rows = [(1, "s", 0), (2, "s", -5), (3, "s", None), (4, "s", 7), (5, "s", 3)]
    df = spark.createDataFrame(rows, "doc_id long, source string, w long")
    out = sorted(r.doc_id for r in weighted_sample_without_replacement(df, 10, "w").collect())
    assert out == [4, 5]  # zero/negative/NULL weights are ineligible, not NaN-ranked
