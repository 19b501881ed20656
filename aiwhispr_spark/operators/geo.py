"""Geo proximity join: all point pairs within a radius, via grid-cell
blocking — the spatial sibling of the MinHash/SimHash band joins
(operators/dedup.py): bucket, join buckets, verify exactly.

Web KGs carry coordinates (infobox "coordinates" rows, schema.org
GeoCoordinates); "which entities are near each other" powers
disambiguation (two "Springfield"s), venue/POI conflation, and
geo-duplicate detection.  A cross join is O(n²); grid blocking with cell
size = radius guarantees every true pair falls in the same or an adjacent
cell, so only the 3×3 neighborhood joins.

Exactness contract (oracle = brute-force SQL cross join):
* coordinates are integer MICRODEGREES (lat_u, lon_u) — no floats;
* distance is PLANAR squared micro-degrees dist2 = Δlat² + Δlon² (the
  documented subset: exact integer math both engines; great-circle
  correction is a production refinement, not a semantics change);
* a pair (id_a < id_b) is emitted iff dist2 ≤ radius_u² — the blocking is
  lossless by the pigeonhole above, pinned by the brute-force twin gate;
* grid indices offset by +90°/+180° so the division is non-negative
  integer division in both engines (no floor-vs-truncate divergence).

100 TB shape: the shuffle carries (id, lat_u, lon_u, cell) rows only —
9× the point count on the exploded side, never a cross product; the join
keys on the composite cell id, AQE handles dense-city cell skew; the
verify is JVM integer arithmetic on already-joined rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_LAT_OFF = 90_000_000
_LON_OFF = 180_000_000


def grid_nearby_pairs(
    points: DataFrame,
    radius_u: int,
    id_col: str = "id",
    lat_col: str = "lat_u",
    lon_col: str = "lon_u",
) -> DataFrame:
    """(id_a, id_b, dist2) for every pair with planar squared distance
    ≤ radius_u² (id_a < id_b; see module contract)."""
    base = points.select(
        F.col(id_col).alias("id"),
        F.col(lat_col).cast("long").alias("lat_u"),
        F.col(lon_col).cast("long").alias("lon_u"),
    ).withColumns(
        {
            "cx": F.expr(f"(lon_u + {_LON_OFF}L) div {radius_u}L"),
            "cy": F.expr(f"(lat_u + {_LAT_OFF}L) div {radius_u}L"),
        }
    )
    offsets = F.array(
        *[
            F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy"))
            for dx in (-1, 0, 1)
            for dy in (-1, 0, 1)
        ]
    )
    left = base.select(
        F.col("id").alias("id_a"),
        F.col("lat_u").alias("lat_a"),
        F.col("lon_u").alias("lon_a"),
        F.explode(offsets).alias("o"),
        "cx",
        "cy",
    ).select(
        "id_a",
        "lat_a",
        "lon_a",
        (F.col("cx") + F.col("o.dx")).alias("jx"),
        (F.col("cy") + F.col("o.dy")).alias("jy"),
    )
    right = base.select(
        F.col("id").alias("id_b"),
        F.col("lat_u").alias("lat_b"),
        F.col("lon_u").alias("lon_b"),
        F.col("cx").alias("jx"),
        F.col("cy").alias("jy"),
    )
    dlat = F.col("lat_a") - F.col("lat_b")
    dlon = F.col("lon_a") - F.col("lon_b")
    dist2 = dlat * dlat + dlon * dlon
    return (
        left.join(right, ["jx", "jy"])
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", dist2.alias("dist2"))
        .where(F.col("dist2") <= F.lit(radius_u * radius_u))
    )

_GEOHASH32 = "0123456789bcdefghjkmnpqrstuvwxyz"


def geohash_cells(
    df: DataFrame,
    lat_col: str = "lat_e7",
    lng_col: str = "lng_e7",
    precision: int = 7,
    out_col: str = "geohash",
) -> DataFrame:
    """Append the standard geohash (base32, lng-first bit interleave)
    computed from INTEGER 1e-7-degree coordinates: the all-BIGINT
    quantization ``(lat_e7+9·10⁸)·2³⁰ div 1.8·10⁹`` reproduces the exact
    binary subdivision of the classic float algorithm (verified against
    the canonical (57.64911, 10.40744) → 'u4pruydqqvj' vector), so the
    DuckDB twin is the same arithmetic with zero float-rounding risk.

    Unrolled per character (shiftright + bitwiseAND + one element_at into
    the base32 alphabet) — pure JVM projection, zero shuffle; prefix
    truncation of the output IS spatial coarsening, which is what makes
    geohash the standard grid-join / spatial-partitioning key."""
    if not 1 <= precision <= 12:
        raise ValueError("precision must be 1..12")
    latq = F.expr(f"({lat_col} + 900000000L) * 1073741824L div 1800000000L")
    lngq = F.expr(f"({lng_col} + 1800000000L) * 1073741824L div 3600000000L")
    alphabet = F.array(*[F.lit(ch) for ch in _GEOHASH32])
    chars = []
    for c in range(precision):
        v = F.lit(0)
        for k in range(5):
            j = 5 * c + k
            q, idx = (lngq, j // 2) if j % 2 == 0 else (latq, j // 2)
            bit = F.shiftright(q, 29 - idx).bitwiseAND(F.lit(1))
            v = v * 2 + bit
        chars.append(F.element_at(alphabet, (v + 1).cast("int")))
    return df.withColumn(out_col, F.concat(*chars))
