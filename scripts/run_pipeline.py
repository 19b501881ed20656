"""spark-submit entry point for the KG pipeline.

Cluster launch (the north rule's deployment shape):

    python -m zipapp? no — plain zip:
    cd /root/repo && zip -r /tmp/aiwhispr_spark.zip aiwhispr_spark
    spark-submit --py-files /tmp/aiwhispr_spark.zip \\
        scripts/run_pipeline.py \\
        --input  <docs table path/URI> \\
        --output <kg output dir/URI> \\
        [--resume] [--chunksize 700] [--partitions 256] [--salt 16] [--run-id r1]

Local smoke: scripts/spark_submit_local.sh wraps the same command against a
synthesized corpus.  The session comes from spark-submit's conf (no master
hardcoded here); AQE/Arrow knobs are applied only as defaults.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser(description="aiwhispr-spark KG pipeline")
    ap.add_argument("--input", required=True, help="documents table (parquet path)")
    ap.add_argument("--output", required=True, help="output dir for triples/entities/aliases")
    ap.add_argument("--chunksize", type=int, default=700)
    ap.add_argument("--partitions", type=int, default=32, help="E7 write partitions")
    ap.add_argument("--salt", type=int, default=16, help="subject-hash salt factor")
    ap.add_argument("--run-id", default=None)
    ap.add_argument(
        "--resume", action="store_true",
        help="left_anti against <output>/manifest before processing",
    )
    ap.add_argument(
        "--compact", action="store_true",
        help="skip ingestion; refresh canonical ids of ALL written triples "
        "against the current alias map (run after resume runs merged families)",
    )
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    builder = (
        SparkSession.builder.appName("aiwhispr-kg")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
    )
    spark = builder.getOrCreate()

    from aiwhispr_spark.plans.kg_pipeline import build_knowledge_graph, recanonicalize_output

    if args.compact:
        recanonicalize_output(
            spark, args.output, target_partitions=args.partitions, salt_factor=args.salt
        )
        print(f"KG_COMPACTED output={args.output}")
        spark.stop()
        return

    docs = spark.read.parquet(args.input)
    manifest = None
    manifest_path = os.path.join(args.output, "manifest")
    if args.resume:
        try:
            manifest = spark.read.parquet(manifest_path)
        except Exception:
            print(f"no manifest at {manifest_path}; full run")

    import time

    t0 = time.time()
    result = build_knowledge_graph(
        spark,
        docs,
        output_dir=args.output,
        chunksize=args.chunksize,
        manifest=manifest,
        target_partitions=args.partitions,
        salt_factor=args.salt,
        run_id=args.run_id,
    )
    seconds = time.time() - t0
    metrics = {k: acc.value for k, acc in result["metrics"].items()}
    # pipeline-only wall time (excludes JVM/session startup) — what the
    # N-vs-4N scaling evidence divides by (scripts/scaling_submit.sh)
    print(f"KG_DONE metrics={metrics} seconds={seconds:.2f} output={args.output}")
    spark.stop()


if __name__ == "__main__":
    main()
