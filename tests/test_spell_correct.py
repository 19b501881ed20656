"""Noisy-channel spell correction (fulltext.py::spell_correct_terms)."""


def test_spell_correct_ranking_and_absence(spark):
    from aiwhispr_spark.operators.fulltext import build_inverted_index, spell_correct_terms

    docs = spark.createDataFrame(
        [
            (1, "spark spark spark sparse"),
            (2, "spark sparks parks"),
            (3, "query data"),
        ],
        "doc_id long, text string",
    )
    idx = build_inverted_index(docs)
    got = {r.term: (r.suggestion, r.edits, r.freq) for r in
           spell_correct_terms(idx, ["sparc", "query", "xxxxxxx"], max_edits=2).collect()}
    # sparc: spark (1 edit, freq 4) beats sparks/parks (1-2 edits, lower freq)
    assert got["sparc"] == ("spark", 1, 4)
    # in-vocab term corrects to itself at 0 edits
    assert got["query"] == ("query", 0, 1)
    # nothing within 2 edits -> no row, not a null suggestion
    assert "xxxxxxx" not in got


def test_spell_correct_tie_breaks_by_freq_then_token(spark):
    from aiwhispr_spark.operators.fulltext import build_inverted_index, spell_correct_terms

    docs = spark.createDataFrame(
        [(1, "cat cat cat bat"), (2, "rat bat")],
        "doc_id long, text string",
    )
    idx = build_inverted_index(docs)
    [r] = spell_correct_terms(idx, ["hat"], max_edits=1).collect()
    # cat/bat/rat all 1 edit; cat freq 3 beats bat freq 2 beats rat freq 1
    assert (r.suggestion, r.edits, r.freq) == ("cat", 1, 3)

    tied = spark.createDataFrame(
        [(1, "bat rat"), (2, "bat rat")], "doc_id long, text string"
    )
    [r2] = spell_correct_terms(build_inverted_index(tied), ["hat"], max_edits=1).collect()
    # equal edits AND equal freq -> token asc
    assert (r2.suggestion, r2.edits, r2.freq) == ("bat", 1, 2)
