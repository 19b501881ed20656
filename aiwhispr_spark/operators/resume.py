"""Checkpoint-resume + per-partition lineage manifests.

The reference tracks progress with a ``content_processed_status`` flag column
in SQLite and re-scans for ``status='N'`` (aiwhisprLocalIndex.py:21,59-62).
The distributed recast (SURVEY.md §4): a **manifest table** records every url
that reached the sink, with its partition id and counts; resume is a
``left_anti`` join of the input against the manifest — only unprocessed urls
flow.  The manifest doubles as the per-partition lineage record the north rule
requires (which partition produced which rows, with counts and a run id).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def lineage_manifest(df: DataFrame, url_col: str = "url", run_id: str = "run0") -> DataFrame:
    """One row per (partition, url): the lineage of a completed write.
    Aggregated per input partition — ``spark_partition_id()`` is captured
    BEFORE the groupBy so it reflects the partitioning that produced the
    output files."""
    return (
        df.withColumn("_pid", F.spark_partition_id())
        .groupBy(F.col(url_col).alias("url"), F.col("_pid").alias("partition_id"))
        .agg(F.count(F.lit(1)).alias("rows_out"))
        .withColumn("run_id", F.lit(run_id))
        .withColumn("completed_ts", F.current_timestamp())
    )


def partition_summary(manifest: DataFrame) -> DataFrame:
    """Rollup: rows/urls per partition per run (the metrics side of lineage)."""
    return manifest.groupBy("run_id", "partition_id").agg(
        F.count(F.lit(1)).alias("n_urls"),
        F.sum("rows_out").cast("long").alias("n_rows"),
    )


def filter_unprocessed(
    input_df: DataFrame, manifest: DataFrame | None, url_col: str = "url"
) -> DataFrame:
    """Resume filter: drop urls already present in the manifest (left_anti —
    the distributed form of the reference's ``WHERE content_processed_status='N'``
    work-queue scan).  The manifest side is keyed + deduped so the anti-join
    broadcasts when small."""
    if manifest is None:
        return input_df
    done = manifest.select(F.col("url").alias(url_col)).distinct()
    return input_df.join(F.broadcast(done), url_col, "left_anti")
