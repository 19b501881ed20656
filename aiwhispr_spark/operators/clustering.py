"""Deterministic Lloyd k-means over embedding columns — the domain-clustering
pass of a web-corpus curation pipeline (cluster-then-reweight mixtures, DataComp
/ SemDeDup-style cluster-local dedup, topic-balanced sampling all start here).

The reference engine stops at per-vector similarity search
(`python/vectordb/*VectorDb.py` top-k cosine); corpus-level structure discovery
is new capability this engine adds on top of the same embedding column.

Design — INTEGER-EXACT Lloyd iterations, so the assignment is bit-reproducible
across engines and gateable by hash (no float argmin ties):

* inputs quantize once to a BIGINT grid (``round-half-up(v * scale)``);
* distances are exact integer squared-L2 (no sqrt, no doubles);
* centroid updates round the integer mean back onto the grid
  (``floor(sum/count + 0.5)`` — the division is exact in doubles for any
  |sum| < 2^53, which a 100 TB corpus satisfies per-dimension after the
  count normalization);
* argmin ties break on the smaller cluster id (struct ordering).

100 TB shape: centroids are k×dim ≈ KBs — they live as a plain python list on
the driver (the same bounded-collect contract as similarity.py's IVF seeding)
and enter the plan as LITERALS, so the assign step is a pure narrow JVM map
(zero shuffle, no python, whole-stage codegen).  Each update is ONE exchange
carrying k groups × dim partial sums (map-side combine collapses every task to
≤k rows).  Per iteration: 1 narrow map + 1 skinny shuffle.  Init is the k
lowest-id vectors — deterministic, no RNG (production swaps in k-means‖ init;
the iteration dataflow is identical).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def quantize_expr(vec, scale: int):
    """Float array → BIGINT grid array (round-half-up, engine-portable)."""
    return F.transform(
        vec, lambda x: F.floor(x.cast("double") * scale + F.lit(0.5)).cast("long")
    )


def _assign(pts: DataFrame, centroids: list[list[int]]) -> DataFrame:
    """(id, qv) → (id, cid, dist_l) against literal centroids — narrow map."""

    def dist_to(c: list[int]):
        carr = F.array(*[F.lit(int(v)) for v in c])
        return F.aggregate(
            F.zip_with("qv", carr, lambda a, b: (a - b) * (a - b)),
            F.lit(0).cast("long"),
            lambda acc, v: acc + v,
        )

    best = F.array_min(
        F.array(
            *[
                F.struct(dist_to(c).alias("dist"), F.lit(j).cast("long").alias("cid"))
                for j, c in enumerate(centroids)
            ]
        )
    )
    return pts.select(
        "id", "qv", best["cid"].alias("cid"), best["dist"].alias("dist_l")
    )


def kmeans_lloyd(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 8,
    iterations: int = 2,
    dim: int = 64,
    scale: int = 1000,
) -> DataFrame:
    """(id, cid, dist_l) after ``iterations`` Lloyd update rounds plus a final
    assignment.  ``dist_l`` is the exact integer squared-L2 distance on the
    quantized grid.  Empty clusters keep their previous centroid."""
    pts = (
        df.select(
            F.col(id_col).alias("id"), quantize_expr(F.col(vec_col), scale).alias("qv")
        )
        .repartition(df.sparkSession.sparkContext.defaultParallelism)
        .persist()
    )
    # deterministic init: the k lowest-id vectors (bounded driver collect —
    # k×dim ints, the documented similarity.py contract)
    seed_rows = pts.orderBy("id").limit(k).collect()
    centroids = [list(r["qv"]) for r in seed_rows]

    for _ in range(iterations):
        assigned = _assign(pts, centroids)
        sums = assigned.groupBy("cid").agg(
            F.count(F.lit(1)).alias("cnt"),
            *[F.sum(F.col("qv").getItem(i)).alias(f"s{i}") for i in range(dim)],
        )
        # k rows — bounded collect per iteration (same contract as init)
        new_c = {
            int(r["cid"]): [
                int((r[f"s{i}"] / r["cnt"] + 0.5).__floor__()) for i in range(dim)
            ]
            for r in sums.collect()
        }
        centroids = [new_c.get(j, centroids[j]) for j in range(k)]

    out = _assign(pts, centroids).select("id", "cid", "dist_l")
    pts.unpersist()
    return out
