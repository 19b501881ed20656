"""Geo proximity join (operators/geo.py): blocking losslessness vs an
in-test brute force, cell-boundary pairs, negative coordinates.  The
hash-value gate lives in __spark_entry__ (geo_nearby_pairs vs a
brute-force DuckDB cross-join oracle)."""

from __future__ import annotations

import itertools

from aiwhispr_spark.operators.geo import grid_nearby_pairs


def _points(spark, pts):
    return spark.createDataFrame(pts, "id bigint, lat_u bigint, lon_u bigint")


def test_grid_equals_brute_force_with_boundary_and_negative_coords(spark):
    # deterministic scatter straddling 0 (negative lat/lon) with points
    # sitting exactly on cell boundaries and exactly at the radius
    pts = [
        (i, ((i * 37) % 19 - 9) * 50, ((i * 53) % 23 - 11) * 50)
        for i in range(60)
    ]
    r = 150
    got = {
        (p.id_a, p.id_b, p.dist2)
        for p in grid_nearby_pairs(_points(spark, pts), r).collect()
    }
    want = set()
    for (a, la, lo), (b, lb, lo2) in itertools.combinations(pts, 2):
        d2 = (la - lb) ** 2 + (lo - lo2) ** 2
        if d2 <= r * r:
            want.add((a, b, d2))
    assert got == want
    assert want  # fixture actually produces pairs


def test_pair_on_exact_radius_included_once(spark):
    pts = [(1, 0, 0), (2, 0, 150), (3, 0, 500)]
    rows = grid_nearby_pairs(_points(spark, pts), 150).collect()
    assert {(r.id_a, r.id_b, r.dist2) for r in rows} == {(1, 2, 150 * 150)}
