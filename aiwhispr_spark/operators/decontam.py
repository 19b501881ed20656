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


def remove_duplicate_spans(
    docs: DataFrame,
    n: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_docs: int = 2,
) -> DataFrame:
    """APPLY exact-substring dedup (the cut half of Lee et al. 2022, policy:
    every occurrence of a corpus-duplicated window is removed — the
    conservative curation arm; keep-one-copy election composes with
    `dedup.elect_keepers_by_quality` instead): tokens covered by any
    length-``n`` window occurring in ≥ ``min_docs`` DISTINCT documents are
    cut and the survivors re-joined.

    Returns ``(id, n_tokens, n_removed, cleaned_text)`` (empty string when
    everything was duplicated or the doc had no tokens; NULL text behaves
    as empty — the linededup lesson).

    100 TB shape: the counting shuffle carries ``(xxhash64(gram), id)`` and
    the duplicated-start sets come back as ``(id, pos)`` pairs collected to
    one SMALL array per affected doc — token TEXT never rides an exchange,
    and the actual cut is a pure-JVM filter over the doc's own token array
    (no per-token shuffle, no reassembly groupBy over tokens)."""
    text = F.coalesce(F.col(text_col), F.lit(""))
    tok_arr = F.filter(tokenize(text), lambda t: t != "")
    gram_structs = bound(
        tok_arr,
        lambda toks: F.when(
            F.size(toks) >= n,
            F.transform(
                F.sequence(F.lit(1), F.size(toks) - (n - 1)),
                lambda i: F.struct(
                    i.alias("pos"),
                    F.xxhash64(F.concat_ws(" ", F.slice(toks, i, n))).alias(
                        "gram_key"
                    ),
                ),
            ),
        ).otherwise(F.array().cast("array<struct<pos:int,gram_key:bigint>>")),
    )
    grams = docs.select(
        F.col(id_col).alias("id"), F.explode(gram_structs).alias("g")
    ).select("id", F.col("g.pos").alias("pos"), F.col("g.gram_key").alias("gram_key"))
    dup_keys = (
        grams.groupBy("gram_key")
        .agg(F.countDistinct("id").alias("nd"))
        .where(F.col("nd") >= min_docs)
        .select("gram_key")
    )
    starts = (
        grams.join(dup_keys, "gram_key")
        .groupBy("id")
        .agg(F.collect_set("pos").alias("starts"))
    )
    staged = (
        docs.select(F.col(id_col).alias("id"), text.alias("_txt"))
        .join(starts, "id", "left")
        .select(
            "id",
            F.filter(tokenize(F.col("_txt")), lambda t: t != "").alias("toks"),
            F.coalesce(F.col("starts"), F.array().cast("array<int>")).alias(
                "starts"
            ),
        )
    )
    kept = bound(
        F.col("toks"),
        lambda toks: F.when(
            F.size(toks) >= 1,
            F.filter(
                F.transform(
                    F.sequence(F.lit(1), F.size(toks)),
                    lambda i: F.when(
                        ~F.exists(
                            F.col("starts"),
                            lambda s: (i >= s) & (i <= s + (n - 1)),
                        ),
                        F.element_at(toks, i),
                    ),
                ),
                lambda x: x.isNotNull(),
            ),
        ).otherwise(F.array().cast("array<string>")),
    )
    return staged.select(
        "id",
        F.size("toks").cast("long").alias("n_tokens"),
        (F.size("toks") - F.size(kept)).cast("long").alias("n_removed"),
        F.array_join(kept, " ").alias("cleaned_text"),
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


def ngram_novelty_curve(
    docs: DataFrame,
    n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Marginal n-gram novelty per document in crawl order: how many of the
    doc's DISTINCT length-n token windows appear in NO earlier document
    (earlier = smaller (ts, id)).  The coverage-contribution curve that
    data-ordering / selection policies maximize — a late doc whose windows
    are all already-seen adds nothing, however long it is.

    Election, not state: each gram's first owner is the MINIMUM (ts, id)
    struct over its occurrences, so the result exactly equals a sequential
    first-seen scan without any sequential dependency.  Returns
    ``(id, n_distinct_grams, n_novel, novelty_frac_i)`` with
    ``novelty_frac_i = round(1e4 · novel/distinct)`` (0 for gram-less docs).

    100 TB shape: the election shuffle carries ``(xxhash64(gram), ts, id)``
    — the gram TEXT never rides an exchange (linededup discipline); the
    min-struct aggregate map-side combines; both per-doc rollups are
    map-side-combinable counts keyed on the doc id."""
    order = docs.select(
        F.col(id_col).alias("id"), F.col(ts_col).cast("long").alias("_ts")
    )
    grams = (
        _doc_ngrams(docs, n, text_col, id_col)
        .select("id", F.xxhash64("gram").alias("gram_key"))
        .distinct()
        .join(order, "id")
    )
    owners = grams.groupBy("gram_key").agg(
        F.min(F.struct(F.col("_ts"), F.col("id"))).alias("_first")
    )
    novel = owners.groupBy(F.col("_first")["id"].alias("id")).agg(
        F.count(F.lit(1)).cast("long").alias("n_novel")
    )
    per_doc = grams.groupBy("id").agg(
        F.count(F.lit(1)).cast("long").alias("n_distinct_grams")
    )
    return (
        docs.select(F.col(id_col).alias("id"))
        .join(per_doc, "id", "left")
        .join(novel, "id", "left")
        .select(
            "id",
            F.coalesce("n_distinct_grams", F.lit(0)).cast("long").alias(
                "n_distinct_grams"
            ),
            F.coalesce("n_novel", F.lit(0)).cast("long").alias("n_novel"),
            F.when(
                F.coalesce("n_distinct_grams", F.lit(0)) > 0,
                F.round(
                    F.lit(10000.0)
                    * F.coalesce("n_novel", F.lit(0))
                    / F.col("n_distinct_grams")
                ).cast("long"),
            )
            .otherwise(F.lit(0))
            .alias("novelty_frac_i"),
        )
    )
