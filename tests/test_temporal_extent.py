

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
