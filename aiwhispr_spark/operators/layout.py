"""Z-order (Morton) data layout for multi-dimensional pruning.

At 100 TB the dominant cost of any selective query is the files it CANNOT
skip.  Sorting a table by one column gives perfect min/max pruning on that
column and none on any other; interleaving the bits of two columns into a
Morton key and range-partitioning on it gives every file a small bounding
RECTANGLE in (x, y) space, so a predicate box on either (or both) columns
skips all files whose rectangle misses it — the layout trick behind
Delta/Iceberg ``OPTIMIZE ZORDER BY``.  A KG/curation store wants it for
(host_bucket, crawl_ts)-style access: per-host queries and per-epoch
queries both prune the same files.

Spark-first: the key is pure JVM bit arithmetic (shiftleft/and/or — whole
-stage codegen'd, no python), the layout is ``repartitionByRange`` on the
key + ``sortWithinPartitions`` before write, i.e. ONE range exchange; the
parquet writer then records per-file min/max for x and y automatically,
and future scans prune via ordinary predicate pushdown — no reader-side
code at all.

Correctness gate: the bucket stats query reproduces the interleave in
DuckDB with the same shift/mask cascade, so a single wrong bit anywhere in
the spread breaks the value hash.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _spread16(v: Column) -> Column:
    """Spread the low 16 bits of ``v`` so bit i lands at position 2i —
    the classic mask cascade (…0x00FF00FF → 0x55555555), all JVM."""
    v = v.bitwiseAND(F.lit(0xFFFF))
    v = (v.bitwiseOR(F.shiftleft(v, 8))).bitwiseAND(F.lit(0x00FF00FF))
    v = (v.bitwiseOR(F.shiftleft(v, 4))).bitwiseAND(F.lit(0x0F0F0F0F))
    v = (v.bitwiseOR(F.shiftleft(v, 2))).bitwiseAND(F.lit(0x33333333))
    v = (v.bitwiseOR(F.shiftleft(v, 1))).bitwiseAND(F.lit(0x55555555))
    return v


def zvalue16(x: Column, y: Column) -> Column:
    """32-bit Morton key interleaving the low 16 bits of x (even bit
    positions) and y (odd positions); BIGINT-safe (inputs cast to long)."""
    xs = _spread16(x.cast("long"))
    ys = _spread16(y.cast("long"))
    return xs.bitwiseOR(F.shiftleft(ys, 1)).alias("zvalue")


def zorder_write(
    df: DataFrame, xcol: str, ycol: str, path: str, n_files: int = 16
) -> str:
    """Write ``df`` z-ordered on (xcol, ycol): one range exchange on the
    Morton key, a per-partition sort, per-file min/max stats for BOTH
    columns come free from the parquet writer."""
    keyed = df.withColumn("_z", zvalue16(F.col(xcol), F.col(ycol)))
    (
        keyed.repartitionByRange(n_files, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode("overwrite")
        .parquet(path)
    )
    return path


def zorder_bucket_stats(
    df: DataFrame,
    xcol: str,
    ycol: str,
    shift: int,
    box: tuple[int, int, int, int],
) -> DataFrame:
    """Per-z-bucket bounding rectangles + pruning stats for a query box
    (x_lo, x_hi, y_lo, y_hi): bucket = zvalue >> shift (a pure-arithmetic
    stand-in for 'file'), touched_i = 1 when the bucket's rectangle
    intersects the box, rows_in_box the rows actually inside.  The ratio of
    touched buckets to total is the fraction of files a box scan reads."""
    x_lo, x_hi, y_lo, y_hi = box
    z = zvalue16(F.col(xcol), F.col(ycol))
    per = (
        df.select(
            F.shiftright(z, shift).alias("bucket"),
            F.col(xcol).cast("long").alias("x"),
            F.col(ycol).cast("long").alias("y"),
        )
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.min("x").alias("min_x"),
            F.max("x").alias("max_x"),
            F.min("y").alias("min_y"),
            F.max("y").alias("max_y"),
            F.sum(
                (
                    (F.col("x") >= x_lo)
                    & (F.col("x") <= x_hi)
                    & (F.col("y") >= y_lo)
                    & (F.col("y") <= y_hi)
                ).cast("long")
            ).alias("rows_in_box"),
        )
    )
    touched = (
        (F.col("max_x") >= x_lo)
        & (F.col("min_x") <= x_hi)
        & (F.col("max_y") >= y_lo)
        & (F.col("min_y") <= y_hi)
    )
    return per.select(
        "bucket",
        "n_rows",
        "min_x",
        "max_x",
        "min_y",
        "max_y",
        touched.cast("int").alias("touched_i"),
        "rows_in_box",
    )


def column_encoding_stats(
    df: DataFrame,
    cols,
    sort_col: str,
    rowgroup: int = 4096,
) -> DataFrame:
    """Columnar encoding-size planner: for each candidate column, the exact
    integer byte estimates of the three classic parquet/ORC encodings
    UNDER A GIVEN SORT ORDER (RLE is a property of the layout, not the
    data — sorting by the right key is THE storage lever this surfaces):

    * plain = Σ (4 + len(v))                     (length-prefixed values)
    * dict  = Σ_distinct (4 + len(v)) + (n_rows · key_bits + 7) div 8,
      key_bits = bit-length(n_distinct − 1), min 1
    * rle   = Σ_runs (8 + len(run_value))        (run header + value)

    where runs are maximal adjacent-equal spans in ``sort_col`` order
    WITHIN a row group of ``rowgroup`` sort-key units (runs never span
    row groups — exactly parquet's per-page encoding scope, and it keeps
    the window partitioned instead of single-partition-global).  Emits
    (column, n_rows, n_distinct, n_runs, plain_b, dict_b, rle_b, best),
    best by min bytes with the name ordering plain<dict<rle on ties.

    100 TB shape: per column one row-group-partitioned window pass (the
    same order the writer would lay down) + two small aggregates; columns
    process independently.  NULLs count as zero-length values."""
    outs = []
    for c in cols:
        v = F.coalesce(F.col(c).cast("string"), F.lit(""))
        # order by (sort key, value): when the sort key ties, equal values
        # still group into runs deterministically — without the value
        # tie-break, lag order over duplicate keys is engine-dependent
        w = Window.partitionBy(
            F.expr(f"{sort_col} div {rowgroup}")
        ).orderBy(F.col(sort_col), v)
        runs = df.select(
            v.alias("v"),
            (
                v != F.coalesce(F.lag(v).over(w), F.concat(v, F.lit("\0")))
            )
            .cast("long")
            .alias("is_run_start"),
        )
        agg = runs.agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.countDistinct("v").cast("long").alias("n_distinct"),
            F.sum("is_run_start").cast("long").alias("n_runs"),
            F.sum(F.length("v") + 4).cast("long").alias("plain_b"),
            F.sum(
                F.when(F.col("is_run_start") == 1, F.length("v") + 8).otherwise(0)
            )
            .cast("long")
            .alias("rle_b"),
        )
        dict_vals = (
            df.select(v.alias("v"))
            .distinct()
            .agg(F.sum(F.length("v") + 4).cast("long").alias("dict_payload"))
        )
        row = agg.crossJoin(dict_vals).select(
            F.lit(c).alias("column"),
            "n_rows",
            "n_distinct",
            "n_runs",
            "plain_b",
            (
                F.col("dict_payload")
                + F.expr(
                    "(n_rows * greatest(length(bin(n_distinct - 1)), 1) + 7)"
                    " div 8"
                )
            )
            .cast("long")
            .alias("dict_b"),
            "rle_b",
        )
        outs.append(
            row.withColumn(
                "best",
                F.when(
                    (F.col("plain_b") <= F.col("dict_b"))
                    & (F.col("plain_b") <= F.col("rle_b")),
                    F.lit("plain"),
                )
                .when(F.col("dict_b") <= F.col("rle_b"), F.lit("dict"))
                .otherwise(F.lit("rle")),
            )
        )
    u = outs[0]
    for o in outs[1:]:
        u = u.unionByName(o)
    return u


def gorilla_timestamp_bits(
    df: DataFrame,
    series_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Gorilla delta-of-delta timestamp encoding cost (Pelkonen et al.,
    VLDB 2015 §4.1): per series, sort by time and encode each timestamp as
    D = (tᵢ − tᵢ₋₁) − (tᵢ₋₁ − tᵢ₋₂); the bit schedule is the paper's —
    D = 0 → 1 bit, [−63, 64] → 9, [−255, 256] → 12, [−2047, 2048] → 16,
    else 36; the first point costs 64 (header) and the second 64 + the
    first delta is carried at 36 (conservative single-delta arm).  The
    integer byte estimate drives the same decision `column_encoding_stats`
    makes for RLE/dict: is this column worth a timeseries codec at rest?

    Ties in `ts` within a series order by a stable tie-break (ts, then the
    row's rank among equal stamps is irrelevant to D since equal stamps
    give D-chain over identical values — deterministic either way).
    Timestamps FLOOR to whole seconds (unix_timestamp semantics; the twin
    must floor(epoch(ts)) too — CAST alone rounds half-even on sub-second
    stamps and the bit buckets shift).

    Output per series: (series, n_points, raw_bytes = 8·n, gorilla_bits,
    gorilla_bytes = ceil(bits/8), ratio_i = raw·10⁴ div gorilla_bytes).

    100 TB shape: one window PARTITIONED BY series (the rowgroup-scoped
    column_encoding_stats discipline — never a global sort) with two lags,
    then a per-series aggregate; all arithmetic exact BIGINT."""
    from pyspark.sql.window import Window

    t = df.select(
        F.col(series_col).alias("series"),
        F.unix_timestamp(F.col(ts_col)).cast("long").alias("t"),
    ).withColumn("t1", F.lag("t", 1).over(Window.partitionBy("series").orderBy("t")))
    t = t.withColumn("t2", F.lag("t", 2).over(Window.partitionBy("series").orderBy("t")))
    bits = (
        F.when(F.col("t1").isNull(), F.lit(64))  # header point
        .when(F.col("t2").isNull(), F.lit(36))  # first delta, conservative arm
        .otherwise(
            _dod_bits(F.col("t") - F.col("t1") - (F.col("t1") - F.col("t2")))
        )
    )
    per = t.select("series", bits.cast("long").alias("bits"))
    agg = per.groupBy("series").agg(
        F.count(F.lit(1)).cast("long").alias("n_points"),
        F.sum("bits").cast("long").alias("gorilla_bits"),
    )
    return agg.select(
        "series",
        "n_points",
        (F.col("n_points") * 8).cast("long").alias("raw_bytes"),
        "gorilla_bits",
        F.expr("CAST((gorilla_bits + 7) div 8 AS BIGINT)").alias("gorilla_bytes"),
        F.expr(
            "CAST((n_points * 8 * 10000) div ((gorilla_bits + 7) div 8) AS BIGINT)"
        ).alias("ratio_i"),
    )


def _dod_bits(d):
    return (
        F.when(d == 0, F.lit(1))
        .when((d >= -63) & (d <= 64), F.lit(9))
        .when((d >= -255) & (d <= 256), F.lit(12))
        .when((d >= -2047) & (d <= 2048), F.lit(16))
        .otherwise(F.lit(36))
    )
