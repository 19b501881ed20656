"""Rendezvous (highest-random-weight) shard assignment — the crawl-fleet
partitioner: every key independently picks the shard with the highest
keyed hash, so adding or removing ONE shard remaps ONLY that shard's keys
(1/n churn, vs mod-n hashing's (n-1)/n).  Thaler & Ravishankar 1998's
HRW, the consistent-hashing twin that needs no ring state.

100 TB shape: the argmax over |shards| keyed fingerprints is one flat
codegen'd array_max over struct literals — pure JVM, zero exchange, fused
with the scan.  The shard list is a plan-time literal (fleets are
dozens-scale); a million-shard ring would want a different operator.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from aiwhispr_spark.operators.textstats import fingerprint_expr


def rendezvous_expr(key: Column, shards: list[str]) -> Column:
    """Winning shard for ``key``: argmax over shards of the 60-bit
    md5 fingerprint of ``key || '|' || shard`` (the repo's one fingerprint
    discipline); exact-tie fallback is the lexicographically larger shard
    name via struct max — deterministic, engine-reproducible.  A NULL key
    yields a NULL shard: concat(NULL, …) nulls every fingerprint, and
    without the guard the all-NULL-weight tie would silently dump every
    bad row on the lexicographically last shard — a fake hotspot.  NULL
    keys stay visible for the caller to route or reject."""
    if not shards:
        raise ValueError("rendezvous needs at least one shard")
    scored = F.array(
        *[
            F.struct(
                fingerprint_expr(F.concat(key, F.lit("|" + s))).alias("w"),
                F.lit(s).alias("shard"),
            )
            for s in sorted(set(shards))
        ]
    )
    return F.when(key.isNull(), F.lit(None).cast("string")).otherwise(
        F.array_max(scored)["shard"]
    )


def rendezvous_assign(
    df: DataFrame, shards: list[str], key_col: str = "url", out_col: str = "shard"
) -> DataFrame:
    """Append ``out_col`` = the HRW shard of ``key_col``."""
    return df.withColumn(out_col, rendezvous_expr(F.col(key_col), shards))


def grouped_kfold(
    docs: DataFrame, group_col: str, k: int = 5
) -> DataFrame:
    """Group-aware k-fold assignment with snake (boustrophedon) balancing.

    Train/eval splits must keep ALL documents of one group (host, forum
    thread, near-dup family) in the same fold or the eval leaks — the
    sklearn GroupKFold contract, re-expressed for a cluster.  Plain
    hash-mod assignment honours the grouping but ignores group SIZE; with
    heavy-tailed web hosts that leaves folds 2-3× apart.  Snake balancing
    fixes the tail deterministically: rank groups by (size desc, name
    asc), then fold = r if r < k else 2k-1-r over r = (rank-1) mod 2k —
    the biggest k groups land in distinct folds and each 2k-stripe
    reverses direction, so running fold totals stay within one
    group-size of each other without any sequential greedy state.

    Output: one row per group — (group_col, n_docs, rank, fold).  Callers
    broadcast-join it back onto the corpus (groups ≪ docs).

    Scale: one count exchange onto the group key; the rank is a window
    over the GROUP frame (hosts-sized, not corpus-sized).  A group
    universe too big for one window partition would shard the rank via
    ranking.global_row_number — same contract.
    """
    if k < 2:
        raise ValueError("grouped_kfold needs k >= 2")
    from pyspark.sql import Window

    sizes = docs.groupBy(group_col).agg(F.count(F.lit(1)).alias("n_docs"))
    w = Window.orderBy(F.desc("n_docs"), F.asc(group_col))
    ranked = sizes.withColumn("rank", F.row_number().over(w))
    r = (F.col("rank") - 1) % (2 * k)
    return ranked.withColumn(
        "fold",
        F.when(r < k, r).otherwise(2 * k - 1 - r).cast("long"),
    )


def ring_positions(shards: list[str], vnodes: int = 8) -> list[tuple[str, int]]:
    """(shard, position) virtual-node ring: position = 60-bit md5 fingerprint
    of 'shard#vnode' — driver-side (the ring is nodes·vnodes entries, never
    data-sized), shared verbatim by the oracle builder so both engines see
    the identical ring."""
    import hashlib

    if not shards:
        raise ValueError("consistent hashing needs at least one shard")
    out = []
    for s_ in sorted(set(shards)):
        for v in range(vnodes):
            h = int(hashlib.md5(f"{s_}#{v}".encode()).hexdigest()[:15], 16)
            out.append((s_, h))
    return sorted(out, key=lambda t: (t[1], t[0]))


def consistent_hash_assign(
    df: DataFrame,
    shards: list[str],
    key_col: str = "url",
    vnodes: int = 8,
    out_col: str = "shard",
) -> DataFrame:
    """Consistent-hash ring assignment (Karger et al. 1997): a key goes to
    the first virtual node CLOCKWISE from its hash (wrap to the ring's
    minimum) — the OTHER classic sharder next to rendezvous_assign, kept
    because its selling point is measurable: removing a node moves ONLY the
    keys that hashed to its arcs (≈1/n of keys), where a naive mod-n
    remap moves (n−1)/n.  ``tests`` pin exactly that movement bound.

    Ring and lookup are both deterministic md5 60-bit fingerprints (the
    repo's one fingerprint discipline); the ring broadcasts as a literal
    CASE chain over sorted positions — zero joins, zero shuffle, pure JVM
    binary search compiled as nested whens.  NULL keys yield NULL shard
    (visible, the rendezvous contract)."""
    ring = ring_positions(shards, vnodes)
    key_h = fingerprint_expr(F.col(key_col))  # the repo's ONE fingerprint
    # nested whens over the sorted ring ("first position >= hash"), built in
    # reverse so earlier ring entries take precedence
    result = F.lit(ring[0][0])  # hash > max position wraps to ring minimum
    for shard_name, pos in reversed(ring):
        result = F.when(key_h <= F.lit(pos), F.lit(shard_name)).otherwise(result)
    result = F.when(F.col(key_col).isNull(), F.lit(None)).otherwise(result)
    return df.withColumn(out_col, result)
