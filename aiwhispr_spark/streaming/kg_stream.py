"""Streaming corpus → KG: continuous triple ingestion.

The batch pipeline (plans/kg_pipeline.py) re-expressed as a Structured
Streaming job: a file-source stream of document parquet (the shape in which
a crawler lands new WARC batches) runs the SAME fused E1-E3 kernel per
micro-batch and appends run-tagged triples + lineage manifest rows — so
batch resume and streaming ingestion share one output contract, and a
stalled stream can be resumed by the BATCH pipeline against the same
manifest (and vice versa).

Architecture split (the standard lambda shape for KG maintenance):
* hot path (here): append-only extract→chunk→triples, zero shuffles, one
  python stage per batch — keeps up with arrival rate;
* cold path (batch, periodic): `recanonicalize_output` — global alias
  re-election + id refresh over everything appended so far.  Linking and
  canonicalization need global state, so they do NOT run per micro-batch.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

DOCS_SCHEMA = "url string, warc_ts timestamp, html binary, text string, lang string"


def start_kg_stream(
    spark: SparkSession,
    source_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    max_files_per_trigger: int = 16,
    trigger_available_now: bool = True,
):
    """Stream doc parquet files from `source_dir` into the KG output layout
    (`triples/` + `manifest/`, run_id = ``stream-<batch_id>``).  Exactly-once
    per micro-batch via foreachBatch + checkpoint; a crashed batch replays
    and its orphan rows are dropped by the compaction's manifest semi-join
    (same crash contract as batch resume)."""
    from ..functions.udfs import docs_to_triples_fused
    from ..operators.resume import lineage_manifest

    stream = (
        spark.readStream.schema(DOCS_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(source_dir)
    )

    triples_path = os.path.join(output_dir, "triples")
    manifest_path = os.path.join(output_dir, "manifest")

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        run_id = f"stream-{batch_id}"
        out = docs_to_triples_fused(batch_df).withColumn("run_id", F.lit(run_id)).persist()
        out.write.mode("append").parquet(triples_path)
        manifest = lineage_manifest(out, run_id=run_id)
        no_triple_urls = (
            batch_df.select("url").distinct()
            .join(manifest.select("url"), "url", "left_anti")
            .withColumn("partition_id", F.lit(-1))
            .withColumn("rows_out", F.lit(0))
            .withColumn("run_id", F.lit(run_id))
            .withColumn("completed_ts", F.current_timestamp())
        )
        manifest.unionByName(no_triple_urls).write.mode("append").parquet(manifest_path)
        out.unpersist()

    writer = stream.writeStream.foreachBatch(sink).option("checkpointLocation", checkpoint_dir)
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
