

def test_remove_duplicate_spans_cuts_only_covered_tokens(spark):
    from aiwhispr_spark.operators.decontam import remove_duplicate_spans

    shared = "one two three four five"
    docs = spark.createDataFrame(
        [
            (1, f"alpha {shared} omega"),
            (2, f"start {shared} end"),
            (3, "totally unrelated text body here"),
        ],
        "doc_id long, text string",
    )
    got = {r.id: r for r in remove_duplicate_spans(docs, n=5).collect()}
    assert got[1].cleaned_text == "alpha omega"
    assert (got[1].n_tokens, got[1].n_removed) == (7, 5)
    assert got[2].cleaned_text == "start end"
    assert got[3].n_removed == 0
    assert got[3].cleaned_text == "totally unrelated text body here"


def test_remove_duplicate_spans_overlapping_windows_merge(spark):
    from aiwhispr_spark.operators.decontam import remove_duplicate_spans

    # 6 shared tokens -> two overlapping dup 5-windows; covered union is 6
    shared = "a b c d e f"
    docs = spark.createDataFrame(
        [(1, f"x {shared} y"), (2, shared)], "doc_id long, text string"
    )
    got = {r.id: r for r in remove_duplicate_spans(docs, n=5).collect()}
    assert got[1].cleaned_text == "x y"
    assert got[1].n_removed == 6
    assert got[2].cleaned_text == ""
    assert got[2].n_removed == 6


def test_remove_duplicate_spans_null_and_short_docs(spark):
    from aiwhispr_spark.operators.decontam import remove_duplicate_spans

    docs = spark.createDataFrame(
        [(1, None), (2, "tiny doc")], "doc_id long, text string"
    )
    got = {r.id: r for r in remove_duplicate_spans(docs, n=5).collect()}
    assert (got[1].n_tokens, got[1].cleaned_text) == (0, "")
    assert (got[2].n_tokens, got[2].n_removed, got[2].cleaned_text) == (
        2,
        0,
        "tiny doc",
    )
