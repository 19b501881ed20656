"""k-anonymity generalization-ladder semantics (pii.py::k_anonymity_audit)."""

from __future__ import annotations


def test_k_anonymity_ladder_levels(spark):
    from aiwhispr_spark.operators.pii import k_anonymity_audit

    rows = (
        # (lang, source, bucket): 'en'/'web' b0 ×5 → level 0
        [("en", "web", 0)] * 5
        # 'en'/'web' b1 ×2 + b2 ×3 → each under k, together 5 → level 1
        + [("en", "web", 1)] * 2
        + [("en", "web", 2)] * 3
        # 'fr'/'web' b0 ×2 → still under k at level 1 → suppressed (2)
        + [("fr", "web", 0)] * 2
    )
    df = spark.createDataFrame(rows, "lang string, source string, b long")
    out = k_anonymity_audit(df, ["lang", "source"], "b", k=5).collect()
    got = {(r.lang, r.source, r.b, r.anon_level): r.n_rows for r in out}
    assert got[("en", "web", 0, 0)] == 5
    assert got[("en", "web", -1, 1)] == 5
    assert got[("fr", "web", -1, 2)] == 2
    assert len(out) == 3
    # conservation: every input row lands in exactly one final class
    assert sum(r.n_rows for r in out) == len(rows)


def test_k_anonymity_all_anonymous_passthrough(spark):
    from aiwhispr_spark.operators.pii import k_anonymity_audit

    df = spark.createDataFrame(
        [("en", "web", 7)] * 6, "lang string, source string, b long"
    )
    out = k_anonymity_audit(df, ["lang", "source"], "b", k=5).collect()
    assert len(out) == 1 and out[0].anon_level == 0 and out[0].b == 7
