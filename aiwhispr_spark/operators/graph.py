"""Graph analytics over the triple store: PageRank.

New first-class KG op (the reference stops at indexing; ranking entities by
link structure is the canonical downstream consumer of the (subj, obj) edge
set this engine materializes — e.g. for linker candidate priors).

Spark-first iterative shape (what GraphFrames does under the hood, without
the absent package):

* edges dedup once, REPARTITIONED BY src and PERSISTED — every iteration's
  contribution join reuses the same co-location, so the per-iteration
  shuffle is only the dst-keyed contribution sum;
* each iteration is ONE lazy plan (contribs join + dangling-mass 1-row
  cross join) materialized by a count — iterative algorithms must
  materialize per step or the lineage doubles per iteration (each pr is
  referenced twice: contributions and dangling mass);
* dangling mass (nodes with no out-edges) redistributes uniformly — the
  standard correction, kept as a broadcast 1-row frame, never a collect in
  the loop's hot path;
* head-entity in-degree skew: the contribution sum is a partial-agg
  (map-side combine) keyed by dst, so a Zipf head costs one hot reduce task
  at worst; salt the dst key (operators/skew.py) if a profile shows it.

Totals: iteration cost = |E| map + |V| reduce, ×k iterations; no python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    damping: float = 0.85,
    iterations: int = 5,
    src_col: str = "src",
    dst_col: str = "dst",
    num_partitions: int | None = None,
) -> DataFrame:
    """(node, pr) after `iterations` synchronous PageRank steps on the
    DISTINCT directed edge set.  pr_0 = 1/N uniform;
    pr_{k+1}(v) = (1-d)/N + d·(Σ_{u→v} pr_k(u)/outdeg(u) + dangling_k/N).

    Deterministic given the edge set (joins + aggs; double sums are
    order-sensitive only in the last ulps — emit scaled ints downstream).
    Returns an UNPERSISTED result; intermediates are cleaned up here."""
    spark = edges.sparkSession
    n_part = num_partitions or spark.sparkContext.defaultParallelism
    e = (
        edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
        .distinct()
        .repartition(n_part, "src")
        .persist()
    )
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
        .persist()
    )
    n = nodes.count()  # bounded driver scalar (one count job)
    outd = e.groupBy("src").agg(F.count(F.lit(1)).cast("double").alias("outd")).persist()

    pr = nodes.withColumn("pr", F.lit(1.0 / n)).persist()
    pr.count()
    for _ in range(iterations):
        contribs = (
            e.join(pr.withColumnRenamed("node", "src"), "src")
            .join(outd, "src")
            .select(F.col("dst").alias("node"), (F.col("pr") / F.col("outd")).alias("c"))
            .groupBy("node")
            .agg(F.sum("c").alias("contrib"))
        )
        dangling = (
            pr.join(outd.withColumnRenamed("src", "node"), "node", "left_anti")
            .agg(F.coalesce(F.sum("pr"), F.lit(0.0)).alias("dm"))
        )
        new_pr = (
            nodes.join(contribs, "node", "left")
            .crossJoin(F.broadcast(dangling))
            .select(
                "node",
                (
                    F.lit((1.0 - damping) / n)
                    + damping * (F.coalesce("contrib", F.lit(0.0)) + F.col("dm") / n)
                ).alias("pr"),
            )
            .persist()
        )
        new_pr.count()  # materialize: cut the doubling lineage
        pr.unpersist()
        pr = new_pr
    e.unpersist()
    outd.unpersist()
    nodes.unpersist()
    return pr
