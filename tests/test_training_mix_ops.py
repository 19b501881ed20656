"""Length bucketing boundaries (mixing.py::sequence_length_buckets),
excess-loss domain reweighting (mixing.py::excess_loss_domain_weights),
and curriculum ordering (mixing.py::curriculum_order)."""

from __future__ import annotations


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string, source string")


def test_pow2_bucket_boundaries_and_waste(spark):
    from aiwhispr_spark.operators.mixing import sequence_length_buckets

    rows = [
        (0, "a", "s"),              # 1 token → bucket 1
        (1, "a b", "s"),            # 2 → 2
        (2, "a b c", "s"),          # 3 → 4
        (3, "a b c d", "s"),        # 4 → 4 (exact power stays)
        (4, "a b c d e", "s"),      # 5 → 8
        (5, "", "s"),               # empty → dropped
        (6, None, "s"),             # NULL → dropped
    ]
    out = {r.bucket: r for r in sequence_length_buckets(_docs(spark, rows)).collect()}
    assert set(out) == {1, 2, 4, 8}
    assert out[4].n_docs == 2 and out[4].sum_tokens == 7
    assert out[4].pad_tokens == 8 - 7 == 1
    assert out[4].waste_i == (1 * 10000) // 8
    assert out[1].pad_tokens == 0 and out[1].waste_i == 0


def test_seq_cap_buckets_long_docs_at_cap(spark):
    from aiwhispr_spark.operators.mixing import sequence_length_buckets

    long = " ".join(["t"] * 50)
    out = sequence_length_buckets(
        _docs(spark, [(0, long, "s")]), seq_len_cap=16
    ).collect()
    assert len(out) == 1 and out[0].bucket == 16 and out[0].sum_tokens == 16


def test_doremi_upweights_high_nll_domain_and_conserves(spark):
    from aiwhispr_spark.operators.mixing import excess_loss_domain_weights

    # domain A: repetitive (low NLL under the corpus-self LM);
    # domain B: all-distinct tokens (high NLL) → B gets excess > 0
    rows = [(i, "common common common common", "A") for i in range(8)] + [
        (100 + i, f"rare{i}a rare{i}b rare{i}c rare{i}d", "B") for i in range(2)
    ]
    out = {r.grp: r for r in excess_loss_domain_weights(_docs(spark, rows)).collect()}
    assert out["B"].nll_mi > out["A"].nll_mi
    assert out["B"].excess_mi > 0 and out["A"].excess_mi == 0
    # linear update: B's weight share must exceed its raw token share
    tot_tokens = out["A"].n_tokens + out["B"].n_tokens
    assert out["B"].weight_mi > (out["B"].n_tokens * 1000000) // tot_tokens
    # conservation within rounding slack (±½ per domain)
    s = out["A"].weight_mi + out["B"].weight_mi
    assert abs(s - 1000000) <= len(out)


def test_curriculum_rank_is_dense_and_tier_monotone(spark):
    from aiwhispr_spark.operators.mixing import curriculum_order

    rows = [(i, " ".join(["w"] * (1 + (i % 7))), "s") for i in range(40)]
    out = curriculum_order(_docs(spark, rows)).collect()
    assert sorted(r.rank for r in out) == list(range(1, 41))
    by_rank = sorted(out, key=lambda r: r.rank)
    buckets = [r.bucket for r in by_rank]
    assert buckets == sorted(buckets)  # tiers ascend along the curriculum
    # within a tier the order is hash-shuffled, not id-ordered
    tier4 = [r.doc_id for r in by_rank if r.bucket == 4]
    assert len(tier4) > 3 and tier4 != sorted(tier4)
