"""Fill-in-the-middle transform (packing.py::fim_transform) and
preference-pair mining (preference.py::preference_pairs).  The hash-value
gates live in __spark_entry__ (fim_transform_psm / preference_pairs_crawl
vs relational DuckDB twins); these pin the operator contracts:

* FIM is LOSSLESS: tokens(prefix) ++ tokens(middle) ++ tokens(suffix)
  == tokens(text) for every row, both modes;
* the mode coin and cut points are content-seeded (rerun-stable);
* preference pairs are consecutive-only, gain-gated, and never pair
  across urls.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from aiwhispr_spark.operators.packing import fim_transform
from aiwhispr_spark.operators.preference import preference_pairs


def _docs(spark, texts):
    return spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )


def test_fim_splice_back_lossless(spark):
    texts = [
        "alpha beta gamma delta epsilon zeta eta theta",
        "one",
        "  spaced   out    tokens  ",
        "",
        None,
        "a b c d e f g h i j k l m n o p q r s t u v w x y z",
    ]
    d = _docs(spark, texts)
    out = fim_transform(d, fim_pct=50)
    joined = out.join(d, "doc_id").collect()
    assert len(joined) == len(texts)
    for r in joined:
        orig = (r.text or "").split()
        spliced = r.prefix.split() + r.middle.split() + r.suffix.split()
        assert spliced == orig, r
        assert (r.n_prefix, r.n_middle, r.n_suffix) == (
            len(r.prefix.split()), len(r.middle.split()), len(r.suffix.split())
        )
        if r.mode == "plain":
            assert r.middle == "" and r.suffix == ""


def test_fim_gate_extremes_and_determinism(spark):
    d = _docs(spark, ["w x y z"] * 1 + ["p q r"] * 1)
    all_fim = fim_transform(d, fim_pct=100).collect()
    assert {r.mode for r in all_fim} == {"fim"}
    none_fim = fim_transform(d, fim_pct=0).collect()
    assert {r.mode for r in none_fim} == {"plain"}
    a = sorted(map(tuple, fim_transform(d, fim_pct=50).collect()))
    b = sorted(map(tuple, fim_transform(d, fim_pct=50).collect()))
    assert a == b


def test_fim_rejects_bad_pct(spark):
    import pytest

    with pytest.raises(ValueError):
        fim_transform(_docs(spark, ["x"]), fim_pct=101)


def _snaps(spark, rows):
    return spark.createDataFrame(
        rows, "url string, warc_ts long, text string, q long"
    )


def test_preference_pairs_consecutive_gain_gated(spark):
    rows = [
        ("u1", 10, "v0", 3),
        ("u1", 20, "v1", 7),   # gain 4 -> emit
        ("u1", 30, "v2", 6),   # gain -1 -> no
        ("u1", 40, "v3", 8),   # gain 2 vs v2 (consecutive, NOT vs v1)
        ("u2", 10, "w0", 5),   # first snapshot: no predecessor
        ("u2", 20, "w1", 6),   # gain 1 < min_gain
    ]
    out = preference_pairs(_snaps(spark, rows), min_gain=2).collect()
    got = sorted((r.url, r.ts_old, r.ts_new, r.rejected, r.chosen, r.gain) for r in out)
    assert got == [
        ("u1", 10, 20, "v0", "v1", 4),
        ("u1", 30, 40, "v2", "v3", 2),
    ]


def test_preference_pairs_never_cross_urls(spark):
    rows = [("a", 1, "t0", 0), ("b", 2, "t1", 100)]
    assert preference_pairs(_snaps(spark, rows), min_gain=1).count() == 0


def test_preference_pairs_quality_col_plugs_in(spark):
    rows = [("u", 1, "short", 0), ("u", 2, "much longer text", 0)]
    snaps = _snaps(spark, rows).withColumn("nq", F.length("text").cast("long"))
    out = preference_pairs(snaps, min_gain=1, quality_col="nq").collect()
    assert [(r.rejected, r.chosen) for r in out] == [("short", "much longer text")]
