"""PDF/OCR text-cleanup semantics (unicodenorm.py::pdf_text_cleanup)."""

from __future__ import annotations


def test_cleanup_stages_and_counts(spark):
    from aiwhispr_spark.operators.unicodenorm import pdf_text_cleanup

    df = spark.createDataFrame(
        [
            (0, "efﬁcient compu-\ntation of ﬂows"),
            (1, "X-\nray stays; mid-\nline rejoins"),
            (2, "no   changes\t here "),
            (3, "ﬀ ﬃ ﬄ ﬅ ﬆ"),
        ],
        "doc_id long, text string",
    )
    rows = {r.id: r for r in pdf_text_cleanup(df).collect()}
    assert rows[0].clean_text == "efficient computation of flows"
    assert (rows[0].n_ligatures, rows[0].n_rejoins) == (2, 1)
    # uppercase second fragment is NOT rejoined; lowercase one is
    assert rows[1].clean_text == "X- ray stays; midline rejoins"
    assert rows[1].n_rejoins == 1
    assert rows[2].clean_text == "no changes here"
    assert rows[3].clean_text == "ff ffi ffl st st"
    assert rows[3].n_ligatures == 5


def test_topk_incremental_merge_equals_global(spark):
    from pyspark.sql import functions as F

    from aiwhispr_spark.operators.topk import topk_incremental_merge

    df = spark.createDataFrame(
        [(i, (i * 37) % 101) for i in range(200)], "id long, score long"
    )
    order = [F.col("score").desc(), F.col("id")]
    parts = [df.filter(F.col("id") % 3 == r) for r in range(3)]
    merged = topk_incremental_merge(parts, 10, order).collect()
    direct = df.orderBy(*order).limit(10).collect()
    assert merged == direct
