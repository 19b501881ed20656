"""Redirect-chain resolution: follow a functional url→url redirect map
(HTTP 3xx targets, ``<meta http-equiv=refresh>``, ``rel=canonical`` hops) to
its terminal, with cycle detection — pointer jumping, not per-hop walking.

A Common-Crawl-style snapshot is ~1/5 redirect captures; KG provenance and
the link graph must attribute facts to the URL that finally SERVES the
content, so resolving chains is an ingest-time table op, not a crawler
detail.  The reference has no redirect notion (its filepath/S3 listers see
only leaf files); this is a web-first addition in the spirit of
url_canonicalize (operators/urlnorm.py).

Semantics (oracle-mirrored):
* input is one redirect edge per source url (functional map; self-loops
  dropped).  Callers with multi-target captures pre-elect one (e.g.
  max_by(warc_ts) — same discipline as url_latest_crawl).
* a source RESOLVES to the first node reached that has no outgoing
  redirect; ``hops_i`` = exact chain length.
* a source whose chain never leaves the redirect map within ``max_chain``
  hops (a cycle, or a longer-than-bound chain) emits ``final = src``,
  ``hops_i = -1``, ``cyc_i = 1`` — "keep the original url, flag it".

100 TB shape: POINTER HALVING — ceil(log2(max_chain)) self-joins instead
of max_chain per-hop walks.  State is a fixed-width (node, ptr, dist) row
per redirect source; each round is ONE shuffle keyed on ptr; every round
persists + counts to cut iterative-plan lineage (the repo-wide discipline,
see operators/graph_query.py::transitive_closure).  A 64-hop bound costs 6
rounds; chains longer than the bound degrade to flagged-unresolved, never
to wrong answers.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def resolve_redirects(
    edges: DataFrame,
    max_chain: int = 64,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """(src, final, hops_i, cyc_i) for every redirect source (see module
    contract).  ``edges`` must be functional on ``src_col``; violations
    raise rather than silently picking a branch."""
    if max_chain < 1:
        raise ValueError("max_chain must be >= 1")
    e = (
        edges.select(F.col(src_col).alias("node"), F.col(dst_col).alias("ptr"))
        .filter(F.col("node") != F.col("ptr"))
        .distinct()
        .persist()
    )
    dup = e.groupBy("node").count().filter(F.col("count") > 1).limit(1).collect()
    if dup:
        e.unpersist()
        raise ValueError(
            f"redirect map is not functional: {dup[0]['node']!r} has multiple targets"
        )
    state = e.withColumn("dist", F.lit(1).cast("long")).persist()
    state.count()
    e.unpersist()
    rounds = max(1, math.ceil(math.log2(max_chain)))
    for _ in range(rounds):
        # ptr-jump: ptr'(x) = ptr(ptr(x)) where defined (terminals are
        # fixpoints — the left join leaves them in place)
        nxt = (
            state.alias("a")
            .join(
                state.select(
                    F.col("node").alias("ptr"),
                    F.col("ptr").alias("ptr2"),
                    F.col("dist").alias("dist2"),
                ).alias("b"),
                "ptr",
                "left",
            )
            .select(
                F.col("node"),
                F.coalesce(F.col("ptr2"), F.col("ptr")).alias("ptr"),
                (F.col("dist") + F.coalesce(F.col("dist2"), F.lit(0))).alias("dist"),
            )
            .persist()
        )
        nxt.count()  # materialize, cut lineage
        state.unpersist()
        state = nxt
    # resolved iff the final pointer is NOT itself a redirect source (cycles
    # converge onto in-cycle nodes; over-bound chains onto in-map nodes)
    srcs = state.select(F.col("node").alias("ptr")).withColumn(
        "in_map", F.lit(True)
    )
    out = (
        state.join(srcs, "ptr", "left")
        .select(
            F.col("node").alias("src"),
            F.when(F.col("in_map").isNull(), F.col("ptr"))
            .otherwise(F.col("node"))
            .alias("final"),
            F.when(F.col("in_map").isNull(), F.col("dist"))
            .otherwise(F.lit(-1))
            .cast("long")
            .alias("hops_i"),
            F.when(F.col("in_map").isNull(), F.lit(0))
            .otherwise(F.lit(1))
            .cast("int")
            .alias("cyc_i"),
        )
    )
    # the caller's plan executes after state.unpersist would drop the cache;
    # localCheckpoint pins the resolved table and releases the round caches
    pinned = out.localCheckpoint()
    state.unpersist()
    return pinned
