"""KMV sketch merge/fallback semantics (sketches.py::kmv_sketch_estimates),
LEB128 posting compression roundtrip (fulltext.py::postings_varint_stats),
and Dirichlet query-likelihood background mass (fulltext.py::dirichlet_ql_rank)."""

from __future__ import annotations


def test_kmv_small_set_exact_fallback_and_union_merge(spark):
    from aiwhispr_spark.operators.sketches import kmv_sketch_estimates

    # two sources, 5 distinct tokens each with 2 shared → 8 global
    rows = [
        (0, "a b c d e", "s1"),
        (1, "d e f g h", "s2"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, source string")
    out = {r.grp: r for r in kmv_sketch_estimates(docs, k=16).collect()}
    for g, n in [("s1", 5), ("s2", 5), ("(all)", 8)]:
        r = out[g]
        assert r.k_used == n  # < k → exact regime
        assert r.est_distinct == r.exact_distinct == n
        assert r.err_i == 0


def test_kmv_estimate_regime_when_group_exceeds_k(spark):
    from aiwhispr_spark.operators.sketches import kmv_sketch_estimates

    toks = " ".join(f"tok{i}" for i in range(500))
    docs = spark.createDataFrame(
        [(0, toks, "s1")], "doc_id long, text string, source string"
    )
    out = {r.grp: r for r in kmv_sketch_estimates(docs, k=16).collect()}
    r = out["s1"]
    assert r.k_used == 16 and r.exact_distinct == 500
    # KMV with k=16 has ~1/sqrt(14) ≈ 27% relative error; be generous
    assert 250 <= r.est_distinct <= 1000
    # est = (k-1)*2^52 div kth
    assert r.est_distinct == (15 * (1 << 52)) // r.kth_hash


def test_varint_roundtrip_including_multibyte_gaps(spark):
    from aiwhispr_spark.operators.fulltext import (
        postings_varint_stats,
        varint_decode_hex,
    )

    # doc ids force gaps of 1, 127, 128 (2-byte), 20000 (3-byte)
    ids = [5, 6, 133, 261, 20261]
    docs = spark.createDataFrame(
        [(i, "common word") for i in ids] + [(1, "rare")],
        "doc_id long, text string",
    )
    out = {r.token: r for r in postings_varint_stats(docs, top_k=10).collect()}
    r = out["common"]
    assert r.n_docs == 5 and r.raw_bytes == 40
    assert varint_decode_hex(r.hex_postings) == ids
    assert r.varint_bytes == len(r.hex_postings) // 2 < r.raw_bytes
    # single-doc list encodes the absolute id
    assert varint_decode_hex(out["rare"].hex_postings) == [1]


def test_dirichlet_background_mass_ranks_hit_doc_above_miss(spark):
    from aiwhispr_spark.operators.fulltext import dirichlet_ql_rank
    import math

    docs = spark.createDataFrame(
        [
            (0, "apple banana cherry"),
            (1, "apple apple apple"),
            (2, "banana date elder"),
            (3, "fig grape melon"),  # matches nothing → not a candidate
        ],
        "doc_id long, text string",
    )
    out = dirichlet_ql_rank(docs, ["apple", "banana", "zzz_oov"], mu=10, k=10)
    rows = {r.id: r for r in out.collect()}
    assert 3 not in rows  # no matching term → not scored
    assert rows[0].n_hit_terms == 2
    assert rows[1].n_hit_terms == 1  # banana absent but still scored via smoothing
    # doc 0 (both terms) must beat doc 2 (banana only, same length)
    assert rows[0].score_i > rows[2].score_i
    # hand-compute doc 1's score: dl=3, C=12, cf(apple)=4, cf(banana)=2
    exp = round(1e6 * math.log((3 * 12 + 10 * 4) / (12 * (3 + 10)))) + round(
        1e6 * math.log((0 * 12 + 10 * 2) / (12 * (3 + 10)))
    )
    assert rows[1].score_i == exp
