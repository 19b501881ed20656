"""Unit tests for the Bloom membership prefilter (operators/bloomfilter.py),
corpus-self duplicate n-gram spans (decontam.duplicate_ngram_spans), and BPE
pair statistics (textstats.bpe_pair_counts)."""

import pyspark.sql.functions as F
import pytest

from aiwhispr_spark.operators.bloomfilter import (
    bloom_prefilter_semi_join,
    bloom_probe_expr,
    build_bloom_positions,
)
from aiwhispr_spark.operators.decontam import duplicate_ngram_spans
from aiwhispr_spark.operators.textstats import bpe_pair_counts


class TestBloom:
    def test_no_false_negatives_and_join_equivalence(self, spark):
        store = spark.range(200).selectExpr("cast(id as string) AS key")
        delta = spark.range(0, 200, 7).selectExpr("cast(id as string) AS key")
        exact = {
            r["key"]
            for r in store.join(delta, "key", "left_semi").collect()
        }
        got = {
            r["key"]
            for r in bloom_prefilter_semi_join(store, delta, "key").collect()
        }
        assert got == exact  # FPs removed by the exact join, zero FNs

    def test_probe_admits_every_inserted_key(self, spark):
        delta = spark.range(50).selectExpr("cast(id as string) AS key")
        pos = build_bloom_positions(delta, "key", m=64, k=3)
        admitted = delta.filter(
            bloom_probe_expr(F.col("key"), pos, m=64, k=3)
        ).count()
        assert admitted == 50  # Bloom invariant: no false negatives, ever

    def test_false_positives_exist_at_tight_geometry(self, spark):
        # m=16 with 40 keys saturates the filter: non-members MUST pass too
        delta = spark.range(40).selectExpr("cast(id as string) AS key")
        others = spark.range(1000, 1100).selectExpr("cast(id as string) AS key")
        pos = build_bloom_positions(delta, "key", m=16, k=3)
        fp = others.filter(bloom_probe_expr(F.col("key"), pos, m=16, k=3)).count()
        assert fp > 0

    def test_positions_bounded_by_m(self, spark):
        delta = spark.range(10000).selectExpr("cast(id as string) AS key")
        pos = build_bloom_positions(delta, "key", m=128, k=3)
        assert len(pos) <= 128
        assert all(0 <= p < 128 for p in pos)

    def test_empty_delta_admits_nothing(self, spark):
        store = spark.range(10).selectExpr("cast(id as string) AS key")
        delta = store.limit(0)
        assert bloom_prefilter_semi_join(store, delta, "key").count() == 0


class TestDuplicateNgramSpans:
    def test_planted_duplicate_sentence(self, spark):
        shared = "one two three four five six"
        df = spark.createDataFrame(
            [
                (1, "unique alpha words here then " + shared),
                (2, "different beta prefix tokens now " + shared),
                (3, "totally unrelated text with no overlap at all"),
            ],
            "doc_id long, text string",
        )
        rows = {
            r["id"]: r for r in duplicate_ngram_spans(df, n=5).collect()
        }
        # the shared 6-token run contributes 2 shared 5-grams to docs 1 & 2
        assert rows[1]["n_dup"] >= 2 and rows[2]["n_dup"] >= 2
        assert rows[3]["n_dup"] == 0
        assert rows[3]["dup_frac_i"] == 0
        assert rows[1]["dup_frac_i"] == round(
            10000.0 * rows[1]["n_dup"] / rows[1]["n_grams"]
        )

    def test_short_docs_survive_with_zero_grams(self, spark):
        df = spark.createDataFrame(
            [(1, "too short"), (2, "a b c d e f")], "doc_id long, text string"
        )
        rows = {r["id"]: r for r in duplicate_ngram_spans(df, n=5).collect()}
        assert rows[1]["n_grams"] == 0 and rows[1]["dup_frac_i"] == 0
        assert rows[2]["n_grams"] == 2

    def test_within_doc_repetition_not_cross_doc(self, spark):
        # the same gram twice in ONE doc must not count as duplicated
        rep = "x y z w v " * 2
        df = spark.createDataFrame(
            [(1, rep), (2, "no overlap here at all today")],
            "doc_id long, text string",
        )
        rows = {r["id"]: r for r in duplicate_ngram_spans(df, n=5).collect()}
        assert rows[1]["n_dup"] == 0


class TestBpePairCounts:
    def test_hand_computed_counts(self, spark):
        df = spark.createDataFrame(
            [(1, "aba ab"), (2, "aba")], "doc_id long, text string"
        )
        # vocab: aba ×2 → pairs ab, ba each ×2; ab ×1 → pair ab ×1
        got = {r["pair"]: r["n"] for r in bpe_pair_counts(df).collect()}
        assert got == {"ab": 3, "ba": 2}

    def test_single_char_words_excluded(self, spark):
        df = spark.createDataFrame([(1, "a a a bb")], "doc_id long, text string")
        got = {r["pair"]: r["n"] for r in bpe_pair_counts(df).collect()}
        assert got == {"bb": 1}

    def test_top_k_and_tie_break(self, spark):
        df = spark.createDataFrame(
            [(1, "zz yy xx ww")], "doc_id long, text string"
        )
        rows = bpe_pair_counts(df, top_k=2).collect()
        # all counts tie at 1 → pair ASC decides the cut deterministically
        assert [r["pair"] for r in rows] == ["ww", "xx"]
