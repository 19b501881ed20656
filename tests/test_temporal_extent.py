

def test_kg_snapshot_diff_changed_added_removed(spark):
    from aiwhispr_spark.operators.temporal import kg_snapshot_diff

    old = spark.createDataFrame(
        [
            ("A", "based_in", "Berlin"),
            ("A", "owns", "S1"),
            ("B", "based_in", "Paris"),
        ],
        "subj string, pred string, obj string",
    )
    new = spark.createDataFrame(
        [
            ("A", "based_in", "Munich"),   # changed
            ("B", "based_in", "Paris"),    # unchanged -> absent
            ("B", "ceo", "Ada"),           # added
        ],
        "subj string, pred string, obj string",
    )
    got = {(r.subj, r.pred, r.obj_old, r.obj_new, r.change)
           for r in kg_snapshot_diff(old, new).collect()}
    assert got == {
        ("A", "based_in", "Berlin", "Munich", "changed"),
        ("A", "owns", "S1", None, "removed"),
        ("B", "ceo", None, "Ada", "added"),
    }


def test_kg_snapshot_diff_multivalued_churn_not_paired(spark):
    from aiwhispr_spark.operators.temporal import kg_snapshot_diff

    old = spark.createDataFrame(
        [("A", "owns", "S1"), ("A", "owns", "S2")],
        "subj string, pred string, obj string",
    )
    new = spark.createDataFrame(
        [("A", "owns", "S3")], "subj string, pred string, obj string"
    )
    got = {(r.obj_old, r.obj_new, r.change)
           for r in kg_snapshot_diff(old, new).collect()}
    # two removals + one addition: no arbitrary pairing into 'changed'
    assert got == {
        ("S1", None, "removed"),
        ("S2", None, "removed"),
        (None, "S3", "added"),
    }


def test_extract_dated_facts_frames_and_year_bounds(spark):
    from aiwhispr_spark.operators.temporal import extract_dated_facts

    chunks = spark.createDataFrame(
        [
            ("u1", "Acme Corp acquired Beta Ltd in 1994. "
                   "Acme Corp has been based in Berlin since 2003. "
                   "Acme Corp was based in Munich until 1999. "
                   "Acme Corp acquired Gamma in 999. "       # 3-digit: no
                   "Acme Corp acquired Delta in 2150."),     # out of range
        ],
        "url string, text_chunk string",
    )
    got = {(r.subj, r.pred, r.obj, r.qualifier, r.year)
           for r in extract_dated_facts(chunks).collect()}
    assert got == {
        ("Acme Corp", "acquired", "Beta Ltd", "in", 1994),
        ("Acme Corp", "based_in", "Berlin", "since", 2003),
        ("Acme Corp", "based_in", "Munich", "until", 1999),
    }


def test_extract_dated_facts_undated_sentences_skip(spark):
    from aiwhispr_spark.operators.temporal import extract_dated_facts

    chunks = spark.createDataFrame(
        [("u1", "Acme Corp acquired Beta Ltd. Plain words here.")],
        "url string, text_chunk string",
    )
    assert extract_dated_facts(chunks).count() == 0


def test_facts_valid_at_qualifier_semantics(spark):
    from aiwhispr_spark.operators.temporal import facts_valid_at

    dated = spark.createDataFrame(
        [
            ("u", "A", "acquired", "B", "in", 2000),
            ("u", "A", "acquired", "C", "in", 1999),
            ("u", "A", "based_in", "X", "since", 1995),
            ("u", "A", "based_in", "Y", "since", 2001),
            ("u", "A", "based_in", "Z", "until", 2000),
            ("u", "A", "based_in", "W", "until", 1999),
        ],
        "url string, subj string, pred string, obj string, qualifier string,"
        " year int",
    )
    got = {(r.obj, r.qualifier) for r in facts_valid_at(dated, 2000).collect()}
    assert got == {("B", "in"), ("X", "since"), ("Z", "until")}


def test_coalesce_fact_intervals_islands(spark):
    from aiwhispr_spark.operators.temporal import coalesce_fact_intervals

    rows = [
        # fact A: 10,20,35 (gaps 10,15 <= 15) | 90 | 200,210
        ("A", "p", "x", 10), ("A", "p", "x", 20), ("A", "p", "x", 35),
        ("A", "p", "x", 90), ("A", "p", "x", 200), ("A", "p", "x", 210),
        # fact B: single observation -> degenerate island
        ("B", "p", "x", 50),
        # boundary: gap EXACTLY equal to the threshold stays merged
        ("C", "p", "x", 0), ("C", "p", "x", 15),
    ]
    df = spark.createDataFrame(rows, "subj string, pred string, obj string, ts long")
    got = sorted(
        (r.subj, r.valid_from, r.valid_to, r.n_obs)
        for r in coalesce_fact_intervals(df, gap=15).collect()
    )
    assert got == [
        ("A", 10, 35, 3), ("A", 90, 90, 1), ("A", 200, 210, 2),
        ("B", 50, 50, 1),
        ("C", 0, 15, 2),
    ]


def test_truthfinder_three_rounds_hand_computed(spark):
    from aiwhispr_spark.operators.temporal import truthfinder

    rows = [
        ("h1", "s", "p", "A"), ("h2", "s", "p", "A"), ("h3", "s", "p", "B"),
        ("h3", "s", "p", "B"),  # duplicate claim: must not stuff the ballot
    ]
    df = spark.createDataFrame(rows, "host string, subj string, pred string, obj string")
    facts = {r.obj: r for r in truthfinder(df, rounds=3, output="facts").collect()}
    # r1: conf 666666/333333 -> r2: 800000/200000 -> r3: 888888/111111
    assert (facts["A"].conf_i, facts["A"].n_hosts) == (888888, 2)
    assert (facts["B"].conf_i, facts["B"].n_hosts) == (111111, 1)
    trust = {r.host: r.trust_i for r in truthfinder(df, rounds=3, output="trust").collect()}
    assert trust == {"h1": 888888, "h2": 888888, "h3": 111111}


def test_truthfinder_param_guards(spark):
    import pytest

    from aiwhispr_spark.operators.temporal import truthfinder

    df = spark.createDataFrame([("h", "s", "p", "o")],
                               "host string, subj string, pred string, obj string")
    with pytest.raises(ValueError):
        truthfinder(df, rounds=0)
    with pytest.raises(ValueError):
        truthfinder(df, output="beliefs")
