"""Stream-stream interval join + watermark-bounded dedup (streaming/joins.py)
— real StreamingQueries over file sources (distinct mtimes pin batch order;
watermarks only advance AFTER a batch, so eviction needs a 3-batch
choreography, same lesson as the windowed-counts tests)."""

from __future__ import annotations

import json
import os

import pytest


def _write_json(path: str, rows: list[dict], mtime: int) -> None:
    with open(path, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    os.utime(path, (mtime, mtime))


def _run(stream_df, name, ck):
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", ck)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)


def test_interval_join_matches_within_window_across_batches(spark, tmp_path):
    from aiwhispr_spark.streaming.joins import stream_interval_join

    imp_dir, clk_dir = tmp_path / "imp", tmp_path / "clk"
    imp_dir.mkdir(), clk_dir.mkdir()
    # impressions: a@10, b@20 (batch 0)
    _write_json(
        str(imp_dir / "0.json"),
        [
            {"imp_ad": "a", "imp_ts": "2024-01-01 00:00:10"},
            {"imp_ad": "b", "imp_ts": "2024-01-01 00:00:20"},
        ],
        mtime=1_000_000,
    )
    # clicks: a@15 (in window, cross-batch vs impression), b@90 (> 60s late
    # relative to b@20 -> NO match), c@30 (no impression)
    _write_json(
        str(clk_dir / "0.json"),
        [
            {"clk_ad": "a", "clk_ts": "2024-01-01 00:00:15"},
            {"clk_ad": "b", "clk_ts": "2024-01-01 00:01:30"},
            {"clk_ad": "c", "clk_ts": "2024-01-01 00:00:30"},
        ],
        mtime=1_000_000,
    )
    imps = (
        spark.readStream.schema("imp_ad string, imp_ts timestamp")
        .option("maxFilesPerTrigger", 1)
        .json(str(imp_dir))
    )
    clks = (
        spark.readStream.schema("clk_ad string, clk_ts timestamp")
        .option("maxFilesPerTrigger", 1)
        .json(str(clk_dir))
    )
    joined = stream_interval_join(
        imps, clks, "imp_ad", "clk_ad", "imp_ts", "clk_ts", max_delay_seconds=60
    )
    _run(joined, "ssj_out", str(tmp_path / "ck"))
    rows = sorted(
        (r.imp_ad, str(r.imp_ts), str(r.clk_ts))
        for r in spark.sql("SELECT * FROM ssj_out").collect()
    )
    assert rows == [("a", "2024-01-01 00:00:10", "2024-01-01 00:00:15")]


def test_interval_join_requires_distinct_key_names(spark):
    from aiwhispr_spark.streaming.joins import stream_interval_join

    from pyspark.sql import functions as F

    df = spark.range(1).select(F.col("id").alias("k"), F.col("id").cast("timestamp").alias("ts"))
    with pytest.raises(ValueError):
        stream_interval_join(df, df, "k", "k", "ts", "ts", 10)


def test_dedup_within_watermark_drops_then_forgets(spark, tmp_path):
    from aiwhispr_spark.streaming.joins import dedup_within_watermark

    src = tmp_path / "src"
    src.mkdir()
    # batch 0: A twice (in-batch dup) + B
    _write_json(
        str(src / "0.json"),
        [
            {"k": "A", "ts": "2024-01-01 00:00:00"},
            {"k": "A", "ts": "2024-01-01 00:00:01"},
            {"k": "B", "ts": "2024-01-01 00:00:02"},
        ],
        mtime=1_000_000,
    )
    # batch 1: a dup of A inside the horizon (dropped) + a far-future row
    # that advances the watermark past A's state
    _write_json(
        str(src / "1.json"),
        [
            {"k": "A", "ts": "2024-01-01 00:00:03"},
            {"k": "C", "ts": "2024-01-01 01:00:00"},
        ],
        mtime=2_000_000,
    )
    # batch 2: A long after the horizon — but state eviction runs at batch
    # END, so THIS occurrence is still suppressed (dropping beyond the
    # horizon is allowed: the guarantee is only "dups WITHIN the delay are
    # dropped")...
    _write_json(
        str(src / "2.json"),
        [{"k": "A", "ts": "2024-01-01 00:59:59"}],
        mtime=3_000_000,
    )
    # ...batch 3: A after batch 2 evicted the state -> re-emitted (bounded
    # memory is observable)
    _write_json(
        str(src / "3.json"),
        [{"k": "A", "ts": "2024-01-01 01:00:05"}],
        mtime=4_000_000,
    )
    stream = (
        spark.readStream.schema("k string, ts timestamp")
        .option("maxFilesPerTrigger", 1)
        .json(str(src))
    )
    out = dedup_within_watermark(stream, ["k"], "ts", watermark="10 seconds")
    _run(out, "ddw_out", str(tmp_path / "ck"))
    got = sorted((r.k, str(r.ts)) for r in spark.sql("SELECT * FROM ddw_out").collect())
    assert got == [
        ("A", "2024-01-01 00:00:00"),  # first occurrence
        ("A", "2024-01-01 01:00:05"),  # re-emitted after watermark eviction
        ("B", "2024-01-01 00:00:02"),
        ("C", "2024-01-01 01:00:00"),
    ]


def test_interval_join_rejects_any_shared_column(spark):
    import pytest
    from pyspark.sql import functions as F

    from aiwhispr_spark.streaming.joins import stream_interval_join

    l = spark.range(1).select(F.col("id").alias("k1"), F.col("id").cast("timestamp").alias("ts"))
    r = spark.range(1).select(F.col("id").alias("k2"), F.col("id").cast("timestamp").alias("ts"))
    with pytest.raises(ValueError):  # shared 'ts' would be ambiguous in the condition
        stream_interval_join(l, r, "k1", "k2", "ts", "ts", 10)
