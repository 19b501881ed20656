"""Benchmark decontamination: n-gram overlap between a training corpus and
an evaluation/benchmark set (the GPT-3 appendix-C 13-gram rule).

New first-class training-data op (no reference twin — the reference indexes
documents, it does not curate training sets): before training on a crawled
corpus, any document sharing a length-n token window with a benchmark doc is
flagged (and usually dropped), otherwise eval numbers measure memorization.

Spark-first shape:
* benchmark n-grams — distinct, tiny relative to the corpus → BROADCAST;
* corpus n-grams — a pure-JVM sliding window (``transform(sequence(...),
  i -> concat_ws(' ', slice(tokens, i, n)))``), exploded once; no python
  stage, no UDF;
* one aggregation keyed by doc: total windows + hit windows.

At 100 TB the explode is the dominant cost (≈ tokens × 1 rows); it stays a
narrow map feeding a partial-agg sum, so the only shuffle is per-doc counts.
For a benchmark set too big to broadcast, the same plan degrades to a
shuffled semi-join on the gram hash — flag via ``broadcast_benchmark``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .fulltext import tokenize
from ..functions.udfs import bound


def _doc_ngrams(df: DataFrame, n: int, text_col: str, id_col: str) -> DataFrame:
    """(id, gram) — every length-n token window, space-joined.  Docs shorter
    than n tokens contribute no rows (guarded: Spark's sequence(1, k) with
    k < 1 would count DOWN, not produce empty)."""
    # bound: slice(toks, ·) in the lambda body would re-tokenize the full
    # document per window (see functions.udfs.bound)
    grams = bound(
        F.filter(tokenize(F.col(text_col)), lambda t: t != ""),
        lambda toks: F.when(
            F.size(toks) >= n,
            F.transform(
                F.sequence(F.lit(1), F.size(toks) - (n - 1)),
                lambda i: F.concat_ws(" ", F.slice(toks, i, n)),
            ),
        ).otherwise(F.array().cast("array<string>")),
    )
    return df.select(F.col(id_col).alias("id"), F.explode(grams).alias("gram"))


def ngram_decontaminate(
    docs: DataFrame,
    benchmark: DataFrame,
    n: int = 13,
    text_col: str = "text",
    id_col: str = "doc_id",
    broadcast_benchmark: bool = True,
) -> DataFrame:
    """Per-doc contamination report vs a benchmark set: ``(id, n_grams,
    n_hit, contaminated)`` where n_hit counts the doc's window OCCURRENCES
    that appear anywhere in the benchmark's n-gram set and contaminated =
    (n_hit > 0).  Callers drop or down-weight flagged docs."""
    bench_grams = _doc_ngrams(benchmark, n, text_col, id_col).select("gram").distinct()
    if broadcast_benchmark:
        bench_grams = F.broadcast(bench_grams)
    marked = _doc_ngrams(docs, n, text_col, id_col).join(
        bench_grams.withColumn("_hit", F.lit(1)), "gram", "left"
    )
    per_doc = marked.groupBy("id").agg(
        F.count(F.lit(1)).cast("long").alias("n_grams"),
        F.sum(F.coalesce("_hit", F.lit(0))).cast("long").alias("n_hit"),
    )
    # docs with < n tokens have zero windows → join back for full coverage
    return (
        docs.select(F.col(id_col).alias("id"))
        .join(per_doc, "id", "left")
        .select(
            "id",
            F.coalesce("n_grams", F.lit(0)).cast("long").alias("n_grams"),
            F.coalesce("n_hit", F.lit(0)).cast("long").alias("n_hit"),
            (F.coalesce("n_hit", F.lit(0)) > 0).alias("contaminated"),
        )
    )


def duplicate_ngram_spans(
    docs: DataFrame,
    n: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_docs: int = 2,
) -> DataFrame:
    """Corpus-SELF duplicate n-gram report (the signal behind exact-substring
    dedup, Lee et al. 2022 "Deduplicating Training Data Makes Language Models
    Better"): for each document, how many of its length-n token windows occur
    in at least ``min_docs`` DISTINCT documents.

    Returns ``(id, n_grams, n_dup, dup_frac_i)`` with ``dup_frac_i =
    round(1e4 · n_dup/n_grams)`` (0 for gram-less docs).  Callers drop or
    trim docs above a duplicated-span threshold.

    100 TB shape: the corpus-wide counting shuffle carries ``(xxhash64(gram),
    id)`` — 16 bytes/window, the gram TEXT never rides the exchange (the
    linededup discipline); the duplicated-key set joins back on the 8-byte
    hash, so AQE broadcasts it when small and shuffle-joins otherwise."""
    grams = _doc_ngrams(docs, n, text_col, id_col).select(
        "id", F.xxhash64("gram").alias("gram_key")
    )
    dup_keys = (
        grams.groupBy("gram_key")
        .agg(F.countDistinct("id").alias("nd"))
        .where(F.col("nd") >= min_docs)
        .select("gram_key")
    )
    marked = grams.join(
        dup_keys.withColumn("_dup", F.lit(1)), "gram_key", "left"
    )
    per_doc = marked.groupBy("id").agg(
        F.count(F.lit(1)).cast("long").alias("n_grams"),
        F.sum(F.coalesce("_dup", F.lit(0))).cast("long").alias("n_dup"),
    )
    return (
        docs.select(F.col(id_col).alias("id"))
        .join(per_doc, "id", "left")
        .select(
            "id",
            F.coalesce("n_grams", F.lit(0)).cast("long").alias("n_grams"),
            F.coalesce("n_dup", F.lit(0)).cast("long").alias("n_dup"),
            F.when(
                F.coalesce("n_grams", F.lit(0)) > 0,
                F.round(
                    F.lit(10000.0) * F.coalesce("n_dup", F.lit(0)) / F.col("n_grams")
                ).cast("long"),
            )
            .otherwise(F.lit(0))
            .alias("dup_frac_i"),
        )
    )
