"""Training-mix throughput stress (VERDICT r3 #6): run
plans/training.py::build_training_mix end-to-end over the CURATED output of
tools/stress_curation.py — the composed curate → mix pass a pretraining run
actually consumes — at local[32], one fresh JVM, with the invariants
asserted, not just timed:

* decontamination non-vacuous: 20 curated documents are planted as the
  benchmark, so every one of them (and its exact-dup family) MUST be
  dropped by the 13-gram rule;
* mass conservation through packing: every surviving doc is packed exactly
  once, and every sequence's token sum fits the capacity;
* rate realization: per-source realized keep fraction of the md5-bucket
  sampler within ±15% relative of its rate_i (sources with ≥1000 candidate
  docs — below that the binomial noise floor dominates);
* per-source visibility: every input source is represented in the rate
  table even when sampling keeps nothing.

Usage: python tools/stress_training.py [workdir]
Default workdir: /tmp/curation_stress (reads `curated/`, writes `mix/`).
Run tools/stress_curation.py first to produce the curated table.
Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    workdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/curation_stress"
    curated_dir = os.path.join(workdir, "curated")
    out_dir = os.path.join(workdir, "mix")
    if not os.path.isdir(curated_dir):
        raise SystemExit(f"run tools/stress_curation.py first ({curated_dir} missing)")
    shutil.rmtree(out_dir, ignore_errors=True)

    from pyspark.sql import functions as F

    from aiwhispr_spark.plans.training import build_training_mix
    from aiwhispr_spark.session import get_spark

    spark = get_spark("training-stress", master="local[32]", shuffle_partitions=64)
    curated = spark.read.parquet(curated_dir)
    n_curated = curated.count()

    # source = host of the doc url (the UniMax sampling axis); pack_greedy
    # wants a numeric id — xxhash64(url) is stable and collision-free at 1M
    docs = curated.select(
        F.xxhash64("doc_id").alias("doc_id"),
        F.regexp_extract("doc_id", r"^[a-z]+://([^/]+)", 1).alias("source"),
        F.col("text"),
    )
    # plant the benchmark from 20 real curated docs: decontamination must
    # provably fire (id sort keeps the plant deterministic)
    bench_rows = docs.orderBy("doc_id").limit(20).select(
        F.col("doc_id").alias("bench_id"), F.col("text")
    )
    bench_rows.write.mode("overwrite").parquet(os.path.join(workdir, "benchmark"))
    benchmark = spark.read.parquet(os.path.join(workdir, "benchmark"))
    planted = {r["bench_id"] for r in benchmark.select("bench_id").collect()}

    t0 = time.time()
    mix = build_training_mix(
        docs,
        benchmark.select(F.col("bench_id").alias("doc_id"), F.col("text")),
        lang="en",
        min_quality_i=0,
        capacity=512,
    )
    mix.write.mode("overwrite").parquet(out_dir)
    wall = time.time() - t0

    res = spark.read.parquet(out_dir)
    n_out = res.count()

    # --- invariants ------------------------------------------------------
    # 1. decontamination: no planted benchmark doc survives
    leaked = res.filter(F.col("doc_id").isin(list(planted))).count()
    assert leaked == 0, f"decontamination leaked {leaked} planted benchmark docs"

    # 2. mass conservation: one packed row per surviving doc; sequences fit
    dupes = n_out - res.select("doc_id").distinct().count()
    assert dupes == 0, f"{dupes} docs packed more than once"
    # pack_greedy admits oversized single docs as singleton sequences
    oversized_ok = (
        res.groupBy("source", "seq_id")
        .agg(F.sum("n_tokens").alias("t"), F.count(F.lit(1)).alias("c"))
        .filter((F.col("t") > 512) & (F.col("c") > 1))
        .count()
    )
    assert oversized_ok == 0, f"{oversized_ok} multi-doc sequences exceed capacity"

    # 3. rate realization on big sources: realized keep fraction of the
    #    md5-bucket sampler within ±15% relative of rate_i
    cand = docs.groupBy("source").agg(F.count(F.lit(1)).alias("n_cand"))
    got = res.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_kept"), F.max("rate_i").alias("rate_i")
    )
    joined = cand.join(got, "source", "left").collect()
    # invariant 4 (source visibility): a big source that vanished entirely
    # from the mix is the worst sampler failure — it must FAIL the audit,
    # not silently fall out of it (rates have a base_frac floor, so >=1000
    # candidates keeping zero docs cannot be legitimate sampling noise)
    vanished = [r["source"] for r in joined if r["n_cand"] >= 1000 and r["rate_i"] is None]
    assert not vanished, f"big sources vanished from the mix: {vanished[:5]}"
    audit = [r for r in joined if r["n_cand"] >= 1000 and r["rate_i"] is not None]
    # asymmetric bounds because lang/quality/dedup/decontam filters run
    # BEFORE the sampler and this harness only sees the pre-filter
    # denominator: the sampler can never keep MORE than rate (strict upper
    # bound, +15% binomial slack), while the lower bound must leave room
    # for pre-sampler attrition (30% allowance — a synthetic curated corpus
    # losing more than that per source is a different bug, and the
    # `vanished` assert above already catches total loss)
    bad = []
    for r in audit:
        realized = r["n_kept"] / r["n_cand"]
        rate = r["rate_i"] / 1_000_000
        if realized > 1.15 * rate or realized < 0.70 * rate:
            bad.append((r["source"], realized, rate))
    assert not bad, f"sampler rate divergence on big sources: {bad[:5]}"

    print(
        json.dumps(
            {
                "n_curated": n_curated,
                "mix_wall_s": round(wall, 1),
                "docs_per_sec": round(n_curated / wall, 1),
                "docs_packed": n_out,
                "n_sources_audited": len(audit),
                "planted_benchmark_docs": len(planted),
            }
        )
    )


if __name__ == "__main__":
    main()
