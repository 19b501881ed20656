"""Content-defined chunking semantics (fingerprint.py::cdc_chunks /
cdc_dup_chunks): gear-hash cut placement vs an independent python
reference, shift-resistance, edge cases."""

from __future__ import annotations

import hashlib


def _ref_chunks(t, W=16, mask=32):
    n = len(t)
    cuts = []
    for p in range(W, n + 1):
        h = (
            sum(
                (ord(t[p - 1 - j]) * 2654435761 % 2**32) * (1 << j)
                for j in range(W)
            )
            % 2**32
        )
        if h % mask == 0:
            cuts.append(p)
    if n > 0 and (not cuts or cuts[-1] != n):
        cuts.append(n)
    res, s = [], 1
    for e in cuts:
        if e - s + 1 > 0:
            res.append((s, e - s + 1, t[s - 1 : e]))
        s = e + 1
    return res


def test_cdc_matches_python_reference(spark):
    from aiwhispr_spark.operators.fingerprint import cdc_chunks

    texts = [
        (0, "the quick brown fox jumps over the lazy dog and runs far away"),
        (1, "a" * 100),
        (2, "short"),
        (3, ""),
        (4, "word " * 40),
    ]
    docs = spark.createDataFrame(texts, "doc_id long, text string")
    rows = cdc_chunks(docs).collect()
    for d, t in texts:
        got = sorted(
            (r.start, r.chunk_len, r.chunk_md5)
            for r in rows
            if r.doc_id == d
        )
        exp = sorted(
            (s, l, hashlib.md5(ch.encode()).hexdigest())
            for s, l, ch in _ref_chunks(t)
        )
        assert got == exp, f"doc {d}"


def test_cdc_shift_resistance(spark):
    from aiwhispr_spark.operators.fingerprint import cdc_chunks

    base = "the quick brown fox jumps over the lazy dog and runs far away"
    docs = spark.createDataFrame(
        [(0, base), (1, "xx" + base)], "doc_id long, text string"
    )
    rows = cdc_chunks(docs).collect()
    h0 = {r.chunk_md5 for r in rows if r.doc_id == 0}
    h1 = {r.chunk_md5 for r in rows if r.doc_id == 1}
    # a 2-char prefix insertion must leave every chunk after the first
    # cut untouched — the CDC property fixed-size blocking lacks
    assert len(h0 & h1) >= len(h0) - 1 > 0


def test_cdc_dup_chunks_groups(spark):
    from aiwhispr_spark.operators.fingerprint import cdc_dup_chunks

    base = "the quick brown fox jumps over the lazy dog and runs far away"
    docs = spark.createDataFrame(
        [(0, base), (1, "xx" + base), (2, "unrelated text entirely here ok")],
        "doc_id long, text string",
    )
    dups = cdc_dup_chunks(docs).collect()
    assert len(dups) >= 1
    for r in dups:
        assert r.n_occ >= 2 and r.first_id == 0
