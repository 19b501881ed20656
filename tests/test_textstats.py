

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
