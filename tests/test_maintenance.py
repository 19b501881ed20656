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


def test_compaction_plan_bins_by_exclusive_prefix(spark):
    from aiwhispr_spark.operators.maintenance import compaction_plan

    rows = [
        ("d1", "f1", 400), ("d1", "f2", 400), ("d1", "f3", 400),  # f3 prefix=800
        ("d1", "f4", 2000),                                        # big file, own bin
        ("d1", "f5", 10),                                          # prefix 3200 → bin 3
        ("d2", "f1", 50),
    ]
    df = spark.createDataFrame(rows, "part_dir string, file_name string, size_bytes long")
    out = {(r.part_dir, r.file_name): r.bin for r in compaction_plan(df, 1000).collect()}
    assert out[("d1", "f1")] == 0 and out[("d1", "f2")] == 0
    assert out[("d1", "f3")] == 0   # exclusive prefix 800 < 1000: overruns, never fragments
    assert out[("d1", "f4")] == 1   # prefix 1200
    assert out[("d1", "f5")] == 3   # prefix 3200
    assert out[("d2", "f1")] == 0   # directories bin independently


def test_compaction_plan_rejects_bad_target(spark):
    import pytest
    from aiwhispr_spark.operators.maintenance import compaction_plan

    df = spark.createDataFrame([("d", "f", 1)], "part_dir string, file_name string, size_bytes long")
    with pytest.raises(ValueError):
        compaction_plan(df, 0)
