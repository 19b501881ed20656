"""S10/S11 maintenance semantics over site-partitioned parquet."""

from __future__ import annotations

from pyspark.sql import functions as F

from aiwhispr_spark.operators.maintenance import (
    delete_site,
    restore_snapshot,
    snapshot_table,
    write_site_partitioned,
)


def test_delete_site_and_snapshot_roundtrip(spark, tmp_path):
    df = spark.createDataFrame(
        [("siteA", 1, "a"), ("siteA", 2, "b"), ("siteB", 3, "c")],
        ["content_site_name", "chunk_no", "text_chunk"],
    )
    table = str(tmp_path / "chunks")
    write_site_partitioned(df, table)
    assert spark.read.parquet(table).count() == 3

    snap = snapshot_table(table, str(tmp_path / "snaps"), label="pre-delete")

    delete_site(spark, table, "siteA")
    left = spark.read.parquet(table)
    assert left.count() == 1
    assert left.select("content_site_name").first()[0] == "siteB"

    restore_snapshot(snap, table)
    restored = spark.read.parquet(table)
    assert restored.count() == 3
    assert {r[0] for r in restored.select("content_site_name").distinct().collect()} == {
        "siteA",
        "siteB",
    }


def test_partition_pruning_on_site_filter(spark, tmp_path):
    """F8's site filter must prune partitions in the site-partitioned layout."""
    df = spark.range(100).select(
        F.concat(F.lit("site"), (F.col("id") % 4).cast("string")).alias("content_site_name"),
        F.col("id"),
    )
    table = str(tmp_path / "t")
    write_site_partitioned(df, table)
    filtered = spark.read.parquet(table).filter(F.col("content_site_name") == "site1")
    plan = filtered._sc._jvm.PythonSQLUtils.explainString(
        filtered._jdf.queryExecution(), "formatted"
    )
    assert "PartitionFilters: [isnotnull(content_site_name" in plan
    assert filtered.count() == 25
