"""Cross-lingual alias mining (operators/crosslingual.py): anchor counting,
variant-object silence, min_shared, same-lang exclusion.  The hash-value
gate lives in __spark_entry__ (crosslingual_aliases, composed over the REAL
hreflang clustering, vs a closed-form DuckDB oracle)."""

from __future__ import annotations

from aiwhispr_spark.operators.crosslingual import cross_lingual_aliases


def _members(spark, rows):
    return spark.createDataFrame(rows, "cluster string, url string, lang string")


def _triples(spark, rows):
    return spark.createDataFrame(rows, "url string, subj string, pred string, obj string")


def test_invariant_objects_align_subjects(spark):
    m = _members(spark, [("c1", "u_en", "en"), ("c1", "u_de", "de")])
    t = _triples(
        spark,
        [
            ("u_en", "Acme Inc", "founded", "1990"),
            ("u_en", "Acme Inc", "employees", "50"),
            ("u_de", "Acme GmbH", "founded", "1990"),
            ("u_de", "Acme GmbH", "employees", "50"),
            # language-VARIANT objects: silent
            ("u_en", "Acme Inc", "hq", "Munich"),
            ("u_de", "Acme GmbH", "hq", "München"),
        ],
    )
    got = [
        (r.cluster, r.lang_a, r.subj_a, r.lang_b, r.subj_b, r.n_shared)
        for r in cross_lingual_aliases(m, t).collect()
    ]
    assert got == [("c1", "de", "Acme GmbH", "en", "Acme Inc", 2)]


def test_same_language_pages_never_pair(spark):
    m = _members(spark, [("c1", "u1", "en"), ("c1", "u2", "en")])
    t = _triples(spark, [("u1", "A", "p", "x"), ("u2", "B", "p", "x")])
    assert cross_lingual_aliases(m, t).count() == 0


def test_clusters_do_not_cross(spark):
    m = _members(
        spark,
        [("c1", "u1", "en"), ("c1", "u2", "de"), ("c2", "u3", "en"), ("c2", "u4", "de")],
    )
    t = _triples(
        spark,
        [("u1", "A", "p", "x"), ("u2", "B", "p", "x"),
         ("u3", "C", "p", "x"), ("u4", "D", "p", "x")],
    )
    got = {(r.subj_a, r.subj_b) for r in cross_lingual_aliases(m, t).collect()}
    assert got == {("B", "A"), ("D", "C")}  # de < en


def test_min_shared_cut_and_duplicate_facts_once(spark):
    m = _members(spark, [("c1", "u_en", "en"), ("c1", "u_de", "de")])
    t = _triples(
        spark,
        [("u_en", "A", "p", "x"), ("u_en", "A", "p", "x"), ("u_de", "B", "p", "x")],
    )
    out = cross_lingual_aliases(m, t, min_shared=2)
    assert out.count() == 0
    one = cross_lingual_aliases(m, t).collect()
    assert [(r.n_shared) for r in one] == [1]
