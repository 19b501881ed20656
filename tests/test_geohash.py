"""Geohash encoding semantics (geo.py::geohash_cells): canonical vector,
pole/antimeridian corners, prefix containment."""

from __future__ import annotations

import pytest


def test_geohash_canonical_vector_and_corners(spark):
    from aiwhispr_spark.operators.geo import geohash_cells

    df = spark.createDataFrame(
        [
            (0, 576491100, 104074400),
            (1, 0, 0),
            (2, -900000000, -1800000000),
            (3, 899999999, 1799999999),
        ],
        "i long, lat_e7 long, lng_e7 long",
    )
    got = {r.i: r.geohash for r in geohash_cells(df, precision=11).collect()}
    assert got[0] == "u4pruydqqvj"          # the classic Jutland point
    assert got[1] == "s0000000000"
    assert got[2] == "00000000000"          # SW corner = all zeros
    assert got[3] == "zzzzzzzzzzz"          # NE corner = all max
    assert len(set(got.values())) == 4


def test_geohash_prefix_is_containment(spark):
    from aiwhispr_spark.operators.geo import geohash_cells

    # nearby points share prefixes; precision-4 of a point equals the
    # prefix of its precision-8 hash (hierarchical cells)
    df = spark.createDataFrame(
        [(0, 576491100, 104074400)], "i long, lat_e7 long, lng_e7 long"
    )
    g8 = geohash_cells(df, precision=8).collect()[0].geohash
    g4 = geohash_cells(df, precision=4).collect()[0].geohash
    assert g8.startswith(g4)


def test_geohash_rejects_bad_precision(spark):
    from aiwhispr_spark.operators.geo import geohash_cells

    df = spark.createDataFrame([(0, 0, 0)], "i long, lat_e7 long, lng_e7 long")
    with pytest.raises(ValueError):
        geohash_cells(df, precision=0)
