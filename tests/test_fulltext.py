

def test_best_snippet_densest_window_and_ties(spark):
    from aiwhispr_spark.operators.fulltext import best_snippet

    rows = [
        (1, "x x join y hash scan z z join j"),   # window 3 best at 'hash scan'
        (2, "nothing matches here"),
        (3, "join a join b join"),                 # tie on 2 hits -> earliest
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.id: r for r in best_snippet(df, ["join", "hash", "scan"], window=3).collect()}
    assert 2 not in got
    # starts 3 ('join y hash') and 5 ('hash scan z') both score 2 -> earliest
    assert (got[1].start, got[1].n_hits, got[1].snippet) == (3, 2, "join y hash")
    assert (got[3].start, got[3].n_hits, got[3].snippet) == (1, 2, "join a join")


def test_best_snippet_guards(spark):
    import pytest

    from aiwhispr_spark.operators.fulltext import best_snippet

    df = spark.createDataFrame([(1, "a")], "doc_id long, text string")
    with pytest.raises(ValueError):
        best_snippet(df, [], window=3)
    with pytest.raises(ValueError):
        best_snippet(df, ["a"], window=0)
