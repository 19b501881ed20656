"""Unit gates for urlnorm.py::snapshot_line_diff — endpoint election,
trim/empty-line normalization, distinct-set semantics, single-snapshot
degenerate case.  The sf0.01 value gate lives in __spark_entry__.py."""

from aiwhispr_spark.operators.urlnorm import snapshot_line_diff


def _df(spark, rows):
    return spark.createDataFrame(rows, "url string, ts long, text string")


def _one(spark, rows):
    out = snapshot_line_diff(_df(spark, rows), ts_col="ts", text_col="text")
    rs = out.collect()
    assert len(rs) == 1
    return rs[0]


def test_diff_counts_added_removed_common(spark):
    r = _one(
        spark,
        [
            ("https://a.org/p", 1, "keep\ngone one\ngone two"),
            ("https://a.org/p", 5, "keep\nnew line"),
            ("https://a.org/p", 3, "middle snapshots\nare ignored"),
        ],
    )
    assert (r["n_snapshots"], r["n_old_lines"], r["n_new_lines"]) == (3, 3, 2)
    assert (r["n_added"], r["n_removed"], r["n_common"]) == (1, 2, 1)


def test_diff_trim_empty_and_duplicate_lines(spark):
    # padded lines trim, blank lines drop, repeated lines count ONCE
    r = _one(
        spark,
        [
            ("u", 1, "  x  \n\nx\ny"),
            ("u", 2, "x\nz\n   \nz"),
        ],
    )
    assert (r["n_old_lines"], r["n_new_lines"]) == (2, 2)
    assert (r["n_added"], r["n_removed"], r["n_common"]) == (1, 1, 1)


def test_diff_single_snapshot_is_zero_change(spark):
    r = _one(spark, [("u", 7, "a\nb")])
    assert (r["n_snapshots"], r["n_added"], r["n_removed"], r["n_common"]) == (
        1, 0, 0, 2,
    )


def test_diff_url_canonicalization_merges_variants(spark):
    r = _one(
        spark,
        [
            ("https://a.org/p/?utm_source=x", 1, "old"),
            ("https://a.org/p", 2, "new"),
        ],
    )
    assert r["canon_url"].endswith("a.org/p")
    assert (r["n_snapshots"], r["n_added"], r["n_removed"]) == (2, 1, 1)
