"""Winnowing fingerprints (operators/fingerprint.py) — unit pins against an
independent in-test reference implementation of Schleimer/Wilkerson/Aiken,
plus the paper's coverage guarantee (any shared substring of length
>= w + k - 1 yields at least one shared fingerprint)."""

from __future__ import annotations

import hashlib
import re

from pyspark.sql import functions as F

from aiwhispr_spark.operators.fingerprint import (
    fingerprint_summary,
    shared_fingerprint_pairs,
    winnow_fingerprints,
)

K, W = 8, 4


def _py_winnow(text: str, k: int = K, w: int = W) -> set[tuple[int, int]]:
    """Straight-from-the-paper reference: min per window, rightmost tie."""
    t = re.sub(r"[^a-z0-9]", "", text.lower())
    n = len(t) - k + 1
    if n - (w - 1) < 1:
        return set()
    hs = [int(hashlib.md5(t[i : i + k].encode()).hexdigest()[:15], 16) for i in range(n)]
    out = set()
    for j in range(n - w + 1):
        m = min(hs[j : j + w])
        pos = max(p for p in range(j, j + w) if hs[p] == m)
        out.add((m, pos + 1))  # 1-based
    return out


def _spark_fps(spark, rows):
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = winnow_fingerprints(df, k=K, w=W).collect()
    by_doc: dict[int, set[tuple[int, int]]] = {}
    for r in got:
        by_doc.setdefault(r.doc_id, set()).add((r.fp, r.pos))
    return by_doc


def test_matches_paper_reference(spark):
    rows = [
        (1, "The quick brown fox jumps over the lazy dog, twice in a row."),
        (2, "Completely different content with punctuation! And CAPS and 123 digits."),
        (3, "short"),  # < w+k-1 after normalization -> no fingerprints
        (4, "aaaaaaaaaaaaaaaaaaaa"),  # degenerate: all grams identical (tie rule)
    ]
    by_doc = _spark_fps(spark, rows)
    for doc_id, text in rows:
        assert by_doc.get(doc_id, set()) == _py_winnow(text), f"doc {doc_id}"


def test_shared_substring_guarantee(spark):
    # the paper's theorem: a shared run of >= w + k - 1 = 11 normalized chars
    # must produce at least one common fingerprint value
    shared = "zqxjkvwpbm"  # 10 chars -> with one more char appended, 11
    rows = [
        (1, f"left padding text {shared}q more filler here"),
        (2, f"other document entirely {shared}q unrelated tail"),
    ]
    by_doc = _spark_fps(spark, rows)
    fps1 = {fp for fp, _ in by_doc[1]}
    fps2 = {fp for fp, _ in by_doc[2]}
    assert fps1 & fps2, "shared 11-char substring produced no shared fingerprint"


def test_pairs_and_max_df_cut(spark):
    base = "the identical boilerplate sentence repeated across documents"
    rows = [(i, f"{base} variant number {i}") for i in range(1, 5)]
    rows.append((99, "totally disjoint text qwerty uiop asdf ghjkl zxcv bnm"))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    fps = winnow_fingerprints(df, k=K, w=W)

    pairs = {
        (r.id_a, r.id_b): r.shared
        for r in shared_fingerprint_pairs(fps, min_shared=3).collect()
    }
    # all 4 boilerplate docs pair with each other, the disjoint doc with none
    assert set(pairs) == {(a, b) for a in range(1, 5) for b in range(a + 1, 5)}

    # max_df=3 kills fingerprints present in all 4 docs; only the variant-
    # specific overlap (if any) can survive, so every count must shrink
    cut = {
        (r.id_a, r.id_b): r.shared
        for r in shared_fingerprint_pairs(fps, min_shared=1, max_df=3).collect()
    }
    for key, n in cut.items():
        assert n < pairs[key]


def test_summary_shape(spark):
    rows = [(1, "some reasonably long document text for summary hashing")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = fingerprint_summary(winnow_fingerprints(df, k=K, w=W)).collect()
    assert len(out) == 1 and out[0].n_fp == len(_py_winnow(rows[0][1]))
    assert re.fullmatch(r"[0-9a-f]{32}", out[0].fp_md5)
