"""Training-data mix plan: the composed pass between a curated corpus and
the tokenizer — what a pretraining run actually consumes.

Stages, each individually oracle-gated by its own driver query (see
COVERAGE.md), composed here in the order the gates pin:

1. language + quality floor (operators/textstats.py) — the C4-rule front
   gate, thresholded on the SCALED integer score (cross-engine float
   discipline);
2. exact-duplicate keeper election (min doc id per text digest);
3. benchmark decontamination (operators/decontam.py, GPT-3 13-gram rule) —
   survivors must share NO n-gram window with the held-out benchmark;
4. temperature-weighted source re-sampling (operators/mixing.py, UniMax-
   style alpha rates; keep-set is md5-deterministic);
5. greedy sequence packing per source shard (operators/packing.py) —
   deterministic doc-id order, so resume/retry re-derive the same plan.

The end-to-end composition is value-gated by `training_mix_pipeline`
(__spark_entry__.py) against a five-stage DuckDB twin composed from the
same per-stage oracle fragments.

100 TB shape: stages 1-2 are one digest-keyed exchange over the corpus
(32-byte keys); stage 3 is the n-gram explode joined against a BROADCAST
benchmark gram set (benchmarks are MB-scale — never shuffle the corpus
against them); stage 4 broadcasts |sources| rate rows; stage 5's only
exchange groups by shard and the python stage sees skinny
(shard, id, n_tokens, quality_i, rate_i) rows — never document text — with
the per-doc attributes carried through so the composition is ONE lineage
executed once (no re-join against the upstream stages).  Nothing collects
driver-side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from aiwhispr_spark.operators.decontam import ngram_decontaminate
from aiwhispr_spark.operators.mixing import temperature_sample
from aiwhispr_spark.operators.packing import pack_greedy
from aiwhispr_spark.operators.textstats import (
    lang_id_expr,
    quality_features,
    token_count_expr,
)


def build_training_mix(
    docs: DataFrame,
    benchmark: DataFrame,
    lang: str = "en",
    min_quality_i: int = 3000,
    decontam_n: int = 13,
    alpha: float = 0.5,
    base_frac: float = 0.5,
    capacity: int = 256,
    id_col: str = "doc_id",
    text_col: str = "text",
    source_col: str = "source",
) -> DataFrame:
    """(doc_id, source, quality_i, rate_i, n_tokens, seq_id, seq_offset) —
    one row per document that SURVIVES the full mix, with its packed
    position.  Deterministic end to end: every stage's decision is an
    integer or digest comparison, so the same corpus always yields the
    same training mix."""
    feats = quality_features(docs, text_col)
    quality_i = F.round(F.col("quality_score") * 10000).cast("long")
    w = Window.partitionBy(F.md5(F.col(text_col)))
    keeper = F.min(id_col).over(w) == F.col(id_col)
    s1 = (
        feats.withColumn("quality_i", quality_i)
        .withColumn("_lang", lang_id_expr(F.col(text_col)))
        .withColumn("_keep", keeper)
        .filter(
            (F.col("_lang") == lang)
            & (F.col("quality_i") >= min_quality_i)
            & F.col("_keep")
        )
        .select(id_col, source_col, text_col, "quality_i")
    )
    report = ngram_decontaminate(
        s1, benchmark, n=decontam_n, text_col=text_col, id_col=id_col
    )
    clean_ids = report.filter(~F.col("contaminated")).select(
        F.col("id").alias(id_col)
    )
    s2 = s1.join(clean_ids, id_col)
    s3 = temperature_sample(
        s2, source_col=source_col, id_col=id_col, alpha=alpha, base_frac=base_frac
    )
    sized = s3.withColumn("n_tokens", token_count_expr(F.col(text_col)))
    # quality_i/rate_i ride THROUGH the packing stage (pack_greedy carry=)
    # instead of re-joining against s3: the join's right side would be the
    # whole unpersisted stage-1..4 lineage — quality features, the dedup
    # window, the n-gram decontamination explode — executed a SECOND time
    # per action.  Single lineage = single execution.
    packed = pack_greedy(
        sized,
        capacity=capacity,
        shard_col=source_col,
        id_col=id_col,
        tokens_col="n_tokens",
        carry=("quality_i", "rate_i"),
    )
    return packed.select(
        "doc_id",
        F.col("shard").alias("source"),
        "quality_i",
        "rate_i",
        F.col("n_tokens").cast("int").alias("n_tokens"),
        "seq_id",
        "seq_offset",
    )
