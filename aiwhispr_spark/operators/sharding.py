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
