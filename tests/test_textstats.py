

def test_script_profile_counts_and_precedence(spark):
    from aiwhispr_spark.operators.textstats import script_profile

    docs = spark.createDataFrame(
        [
            (1, "abc АБ 一"),          # latin 3, cyr 2, cjk 1
            (2, "АБВ"),               # cyrillic only
            (3, "ab АБ"),                  # 2-2 tie -> latin wins
            (4, "123 !!!"),                          # none
            (5, "あア二가"),         # kana+cjk+hangul = 4
        ],
        "doc_id long, text string",
    )
    got = {r.doc_id: r for r in script_profile(docs).collect()}
    assert (got[1].n_latin, got[1].n_cyrillic, got[1].n_cjk) == (3, 2, 1)
    assert got[1].main_script == "latin"
    assert got[2].main_script == "cyrillic"
    assert got[3].main_script == "latin"
    assert got[4].main_script == "none"
    assert (got[5].n_cjk, got[5].main_script) == (4, "cjk")


def test_script_profile_is_pure_jvm(spark):
    from aiwhispr_spark.operators.textstats import script_profile

    docs = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    plan = script_profile(docs)._jdf.queryExecution().executedPlan().treeString()
    assert "Python" not in plan and "Exchange" not in plan


def test_gopher_rules_panel_edges(spark):
    from aiwhispr_spark.operators.textstats import gopher_rules

    good = " ".join(["the quick brown fox jumps with that energy of note"] * 5)
    df = spark.createDataFrame(
        [
            (1, good),                                   # passes everything
            (2, ""),                                     # empty: line rules pass, wordcount fails
            (3, "- a\n- b\n- c\n- d\n- e\n- f\n- g\n- h\n- i\n- j\nx"),  # 10/11 bullets
            (4, good + " # # # # # # # # # # # # # # #"),  # symbol ratio > 0.1
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in gopher_rules(df, min_words=10, max_words=500).collect()}
    assert out[1].keep == 1
    assert out[2].r_wordcount == 0 and out[2].r_bullets == 1 and out[2].r_ellipsis == 1
    assert out[3].r_bullets == 0
    assert out[4].r_symbol == 0 and out[4].r_wordcount == 1
