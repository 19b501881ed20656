"""Aho–Corasick automaton semantics (keywords.py): failure links,
overlapping matches, output-link flattening, and ac ≡ expr."""

from __future__ import annotations


def test_ac_overlapping_and_nested_matches():
    from aiwhispr_spark.operators.keywords import (
        _ac_count,
        aho_corasick_build,
    )

    pats = ["ana", "banana", "na"]
    g, f, o = aho_corasick_build(pats)
    counts = _ac_count("banana", g, f, o, len(pats))
    # 'ana' at 2 and 4 (overlapping!), 'banana' once, 'na' at 3 and 5
    assert counts == [2, 1, 2]


def test_ac_failure_links_shared_suffixes():
    from aiwhispr_spark.operators.keywords import (
        _ac_count,
        aho_corasick_build,
    )

    pats = ["scan", "can", "an", "a"]
    g, f, o = aho_corasick_build(pats)
    counts = _ac_count("scans can", g, f, o, len(pats))
    # 'scan':1, 'can':2 (inside scan + standalone), 'an':2, 'a':2
    assert counts == [1, 2, 2, 2]


def test_ac_no_match_and_empty_text():
    from aiwhispr_spark.operators.keywords import (
        _ac_count,
        aho_corasick_build,
    )

    g, f, o = aho_corasick_build(["xyz"])
    assert _ac_count("", g, f, o, 1) == [0]
    assert _ac_count("xxyyzz", g, f, o, 1) == [0]


def test_ac_dataframe_path_equals_expr_twin(spark):
    from aiwhispr_spark.operators.keywords import (
        multi_pattern_counts_ac,
        multi_pattern_counts_expr,
    )

    docs = spark.createDataFrame(
        [
            (0, "banana bandana"),
            (1, "a a a a"),
            (2, None),
            (3, ""),
            (4, "scan the scanner cannery"),
        ],
        "doc_id long, text string",
    )
    pats = ["ana", "an", "a a", "scan", "can"]
    ac = {
        (r.id, r.pattern): r.n_hits
        for r in multi_pattern_counts_ac(docs, pats).collect()
    }
    ex = {
        (r.id, r.pattern): r.n_hits
        for r in multi_pattern_counts_expr(docs, pats).collect()
    }
    assert ac == ex
    # banana: ana@2,4 an@2,4; bandana: ana@5, an@2,5
    assert ac[(0, "ana")] == 3 and ac[(0, "an")] == 4
    assert ac[(1, "a a")] == 3  # overlapping 'a a' windows
    assert ac[(4, "scan")] == 2 and ac[(4, "can")] == 3
