"""Bloom-filter membership prefilter — the runtime-filter pattern for
delta-vs-store dedup joins at 100 TB.

Joining a small delta (today's crawl) against a huge digest store to find
duplicates shuffles the ENTIRE store on the digest key.  The Bloom prefilter
inverts the cost: build an m-bit filter over the SMALL side's digests, push
the O(1)-per-row membership probe into the big side's scan, and run the exact
join only on the survivors.  False positives are harmless (the exact join
removes them); false negatives are impossible (every inserted key sets its
bits), so the prefiltered join ≡ the plain join — that equivalence is the
value gate (`bloom_prefilter_dedup` + tests).

Implementation notes
--------------------
* k hash functions derive from md5 of ``digest || ':' || j`` — deterministic,
  engine-portable (the DuckDB oracle recomputes the same bit set, INCLUDING
  the same false positives).
* The bit set is collected to the driver as ≤ m distinct positions and
  shipped back as a literal array — the same lifecycle as Spark's own
  InSubquery runtime filters.  Bounded by m (filter geometry), NEVER by data
  volume; size m to the small side (~10 bits/key for 1% FP), not the store.
* The probe is a pure JVM expression (``forall`` over ``array_contains``) —
  it composes with the scan and costs no shuffle.  A production variant
  packs the positions into m/64 longs; the positions-array form keeps the
  oracle exact without changing the dataflow.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def bloom_positions_expr(col: Column, m: int = 4096, k: int = 3) -> Column:
    """array<long> of the k bit positions for a key (md5-derived, portable)."""
    return F.array(
        *[
            F.conv(
                F.substring(F.md5(F.concat(col, F.lit(f":{j}"))), 1, 8), 16, 10
            ).cast("long")
            % m
            for j in range(k)
        ]
    )


def build_bloom_positions(
    keys: DataFrame, key_col: str, m: int = 4096, k: int = 3
) -> list[int]:
    """The filter's set bit positions (sorted, ≤ m values) — the driver-side
    runtime-filter payload.  The collect is bounded by the filter geometry m,
    never by the key count."""
    rows = (
        keys.select(
            F.explode(bloom_positions_expr(F.col(key_col), m, k)).alias("p")
        )
        .distinct()
        .collect()
    )
    return sorted(r["p"] for r in rows)


def bloom_probe_expr(
    col: Column, positions: list[int], m: int = 4096, k: int = 3
) -> Column:
    """TRUE iff every one of the key's k bit positions is set in the filter —
    a pure expression, pushable into the big side's scan."""
    bits = F.lit(positions)
    return F.forall(
        bloom_positions_expr(col, m, k), lambda p: F.array_contains(bits, p)
    )


def bloom_prefilter_semi_join(
    store: DataFrame,
    delta: DataFrame,
    key_col: str,
    m: int = 4096,
    k: int = 3,
) -> DataFrame:
    """Rows of ``store`` whose key is in ``delta`` — the exact semi-join, run
    only on the bloom survivors.  Result ≡ ``store.join(delta, key,
    'left_semi')`` with the store-side shuffle reduced to the FP-inflated
    survivor set."""
    positions = build_bloom_positions(delta.select(key_col), key_col, m, k)
    survivors = store.filter(bloom_probe_expr(F.col(key_col), positions, m, k))
    return survivors.join(
        F.broadcast(delta.select(key_col).distinct()), key_col, "left_semi"
    )
