"""Driver-faithful oracle dtype harness (VERDICT r4 #1).

The driver's correctness gate executes every oracle through DuckDB's pandas
path (``con.execute(sql).df()``) and stringifies values with plain ``str``.
Two dtype classes silently diverge from Spark's stringification on that path:

- un-CAST DuckDB aggregates (``sum(INTEGER)`` -> HUGEINT, ``round()`` ->
  DECIMAL): pandas has no int128/decimal dtype, so the column lands as
  float64 (``150.0``) or object-of-Decimal while Spark emits ``150`` ->
  hash mismatch with rows/schema green (the r4 ``line_dedup_boilerplate``
  red row);
- nullable integer columns: pandas promotes int-with-NULL to float64
  (``nan``) while Spark stringifies ``None`` (the session-6 gotcha).

This test executes EVERY registered oracle through the pandas path at the
driver's gate tier (sf0.01) and asserts that no output column is floating
point and no object column carries Decimal values.  Gate discipline (see
CLAUDE.md) requires every float output to be a scaled BIGINT and every
nullable numeric to be coalesced to a sentinel, so the correct count of
float64 oracle columns is ZERO.
"""

from __future__ import annotations

import decimal

import duckdb
import pytest

import __spark_entry__ as entrymod

SF_DIR = "/root/testdata/sf0.01"
TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


@pytest.fixture(scope="module")
def oracle_frames():
    """Run every oracle through the driver's pandas path once; yield
    {name: (df | exception)}."""
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    out = {}
    for name, sql in entrymod.oracle_sql().items():
        try:
            out[name] = con.execute(sql).df()
        except Exception as e:  # surface as a failure, not a crash
            out[name] = e
    con.close()
    return out


def test_all_oracles_execute_on_pandas_path(oracle_frames):
    errs = {n: v for n, v in oracle_frames.items() if not hasattr(v, "dtypes")}
    assert not errs, f"oracles failed on the pandas path: {errs}"


def test_no_float_columns_on_driver_path(oracle_frames):
    """HUGEINT/DECIMAL/nullable-int all surface as float64 via .df() —
    any hit here is a gate bug of the line_dedup_boilerplate class."""
    bad = []
    for name, df in oracle_frames.items():
        if not hasattr(df, "dtypes"):
            continue
        for col, dt in df.dtypes.items():
            if dt.kind == "f":
                bad.append((name, col, str(dt)))
    assert not bad, (
        "float-typed oracle columns reach the driver's pandas path "
        "(CAST the aggregate AS BIGINT / coalesce NULL ints to a sentinel): "
        f"{bad}"
    )


def test_no_decimal_objects_on_driver_path(oracle_frames):
    """DuckDB round()/avg-of-decimal emit DECIMAL -> pandas object column of
    decimal.Decimal, which stringifies '150.00' vs Spark '150'."""
    bad = []
    for name, df in oracle_frames.items():
        if not hasattr(df, "dtypes"):
            continue
        for col, dt in df.dtypes.items():
            if dt.kind == "O":
                series = df[col].dropna()
                # check EVERY value, not just the first: a CASE with one
                # un-CAST round() arm yields a mixed str/Decimal column
                # that a first-value probe misses (review r5)
                if len(series) and series.map(
                    lambda v: isinstance(v, decimal.Decimal)
                ).any():
                    bad.append((name, col))
    assert not bad, f"DECIMAL-valued oracle columns (CAST them): {bad}"
