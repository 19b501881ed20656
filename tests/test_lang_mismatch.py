"""Declared-vs-detected language validation (operators/textstats.py::
declared_lang_mismatch): primary-subtag split, no-evidence silence, the
mismatch conjunction.  The hash-value gate lives in __spark_entry__
(declared_lang_mismatch vs the shared lang-detect CTE)."""

from __future__ import annotations

from aiwhispr_spark.operators.textstats import declared_lang_mismatch

_EN = "the cat and the dog went to the house and it was good for all of that it is"
_DE = "der hund und die katze ist nicht mit ein haus und der den eine das ist"


def _sig(spark, pages):
    df = spark.createDataFrame(
        [(u, h.encode()) for u, h in pages], "url string, html binary"
    )
    return {
        r.url: (r.declared_lang, r.detected_lang, r.has_declared_i, r.mismatch_i)
        for r in declared_lang_mismatch(df).collect()
    }


def test_subtag_split_mismatch_and_silence(spark):
    got = _sig(
        spark,
        [
            ("ok", f'<html lang="en-GB"><body>{_EN}</body></html>'),
            ("lie", f'<html lang="en"><body>{_DE}</body></html>'),
            ("none", f"<html><body>{_EN}</body></html>"),
        ],
    )
    assert got["ok"] == ("en", "en", 1, 0)
    assert got["lie"] == ("en", "de", 1, 1)
    assert got["none"] == ("", "en", 0, 0)


def test_quote_and_case_variants_all_recognized(spark):
    got = _sig(
        spark,
        [
            ("sq", f"<html lang='de'><body>{_DE}</body></html>"),
            ("uq", f"<html lang=de><body>{_DE}</body></html>"),
            ("uc", f'<HTML LANG="DE-AT"><body>{_DE}</body></html>'),
        ],
    )
    for u in ("sq", "uq", "uc"):
        assert got[u] == ("de", "de", 1, 0), u
