"""Z-order layout (operators/layout.py): known-value Morton keys, the
pure-JVM plan shape, and the actual pruning payoff — a y-band query must
touch fewer z-ordered parquet files than x-sorted ones (per-file min/max
stats read back via pyarrow, exactly what a scan's row-group pruning sees).
The bit-level gate lives in __spark_entry__ (zorder_bucket_pruning vs a
DuckDB shift/mask cascade oracle)."""

from __future__ import annotations

import glob
import os

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from aiwhispr_spark.operators.layout import zorder_write, zvalue16


def test_zvalue_known_bits(spark):
    rows = [(0, 0), (5, 3), (1, 0), (0, 1), (65535, 65535)]
    df = spark.createDataFrame(rows, "x long, y long")
    got = [
        r.z
        for r in df.select(zvalue16(F.col("x"), F.col("y")).alias("z"))
        .orderBy("x", "y")
        .collect()
    ]
    # (0,0)->0; (0,1)->2; (1,0)->1; (5,3)->27; full 16-bit -> 2^32-1
    assert got == [0, 2, 1, 27, (1 << 32) - 1]


def test_zvalue_is_pure_jvm(spark):
    df = spark.createDataFrame([(1, 2)], "x long, y long")
    plan = (
        df.select(zvalue16(F.col("x"), F.col("y")))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Python" not in plan and "Exchange" not in plan


def _files_touched_by_y_band(path: str, y_lo: int, y_hi: int) -> tuple[int, int]:
    """(touched, total) from per-file parquet column stats for y — the same
    min/max a scan's file/row-group pruning consults."""
    touched = total = 0
    for f in glob.glob(os.path.join(path, "*.parquet")):
        md = pq.ParquetFile(f).metadata
        if md.num_rows == 0:
            continue
        total += 1
        lo = min(
            md.row_group(i).column(1).statistics.min for i in range(md.num_row_groups)
        )
        hi = max(
            md.row_group(i).column(1).statistics.max for i in range(md.num_row_groups)
        )
        if hi >= y_lo and lo <= y_hi:
            touched += 1
    return touched, total


def test_zorder_layout_prunes_more_files_than_linear_sort(spark, tmp_path):
    pts = spark.range(4096).select(
        ((F.col("id") * 37) % 256).alias("x"), ((F.col("id") * 101) % 256).alias("y")
    )
    zpath = str(tmp_path / "zord")
    lpath = str(tmp_path / "linear")
    zorder_write(pts, "x", "y", zpath, n_files=16)
    # the single-column alternative: perfect x pruning, zero y pruning
    pts.repartitionByRange(16, "x").sortWithinPartitions("x").write.parquet(lpath)

    z_touched, z_total = _files_touched_by_y_band(zpath, 0, 63)
    l_touched, l_total = _files_touched_by_y_band(lpath, 0, 63)
    assert l_touched == l_total  # x-sort: every file spans all y
    # z-order: a quarter-height band touches roughly half the files
    # (each z file spans ~2 of the 4 y quartiles); must beat the x-sort
    assert z_touched < l_touched
    assert z_touched <= z_total * 0.75
