"""Graph analytics over the triple store: PageRank, HITS, k-core.

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
    if n == 0:
        e.unpersist()
        nodes.unpersist()
        return nodes.select("node", F.lit(0.0).alias("pr")).limit(0)
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
            .localCheckpoint()  # truncate lineage, not just materialize:
            # pr is referenced 3× per step (contribs, dangling, join), so the
            # LOGICAL plan grows ~3^k under persist alone (see hits())
        )
        pr.unpersist()
        pr = new_pr
    e.unpersist()
    outd.unpersist()
    nodes.unpersist()
    return pr


def personalized_pagerank(
    edges: DataFrame,
    seeds: DataFrame,
    damping: float = 0.85,
    iterations: int = 5,
    src_col: str = "src",
    dst_col: str = "dst",
    num_partitions: int | None = None,
) -> DataFrame:
    """(node, pr) after `iterations` synchronous PERSONALIZED PageRank steps:
    the teleport vector is uniform over the seed set instead of all nodes
    (TrustRank, Gyöngyi et al. 2004 — seed a whitelist of trusted hosts and
    authority flows only out of it; `spam mass` = how much of a node's plain
    PageRank is NOT backed by trust).

      tele(v)   = 1/|S| if v ∈ seeds else 0
      pr_0      = tele
      pr_{k+1}(v) = (1-d)·tele(v) + d·(Σ_{u→v} pr_k(u)/outdeg(u)
                                       + dangling_k·tele(v))

    Same iterative shape as :func:`pagerank` (edges persisted once,
    localCheckpoint per step — pr is referenced 3× per iteration); the tele
    column rides the node frame so no per-step extra join.  The node
    universe is edge endpoints ∪ SEEDS: a whitelisted host absent from the
    crawl graph still holds its teleport share ((1−d)·tele + d·dang·tele
    each round, dangling since it has no out-edges) and appears in the
    output — silently destroying its mass would deflate every trust score.
    Deterministic given edges+seeds (double math — emit scaled ints
    downstream)."""
    spark = edges.sparkSession
    n_part = num_partitions or spark.sparkContext.defaultParallelism
    e = (
        edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
        .distinct()
        .repartition(n_part, "src")
        .persist()
    )
    s = seeds.select(F.col(seeds.columns[0]).alias("node")).distinct().persist()
    n_seeds = s.count()  # bounded driver scalar
    nodes_base = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .union(s.select("node"))  # out-of-graph seeds stay in the universe
        .distinct()
    )
    if n_seeds == 0:
        e.unpersist()
        s.unpersist()
        return nodes_base.select("node", F.lit(0.0).alias("pr")).limit(0)
    nodes = (
        nodes_base.join(F.broadcast(s.withColumn("is_seed", F.lit(True))), "node", "left")
        .select(
            "node",
            F.when(F.col("is_seed"), F.lit(1.0 / n_seeds))
            .otherwise(F.lit(0.0))
            .alias("tele"),
        )
        .persist()
    )
    nodes.count()
    outd = e.groupBy("src").agg(F.count(F.lit(1)).cast("double").alias("outd")).persist()

    pr = nodes.select("node", F.col("tele").alias("pr")).persist()
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
                    (1.0 - damping) * F.col("tele")
                    + damping
                    * (
                        F.coalesce("contrib", F.lit(0.0))
                        + F.col("dm") * F.col("tele")
                    )
                ).alias("pr"),
            )
            .localCheckpoint()  # see pagerank(): pr referenced 3×/step
        )
        pr.unpersist()
        pr = new_pr
    e.unpersist()
    s.unpersist()
    outd.unpersist()
    nodes.unpersist()
    return pr


def degree_profile(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """Power-of-two degree histogram over the canonical undirected edge set:
    (bucket, n_nodes, min_deg, max_deg, sum_deg) with ``bucket =
    ⌊log2(deg)⌋`` computed as ``length(bin(deg)) − 1`` — a pure
    integer/string op, NO float log (cross-engine exact).  The standard
    at-scale graph profile: a heavy power-law tail shows up as slowly
    decaying bucket counts and tells you which joins need the hub caps /
    salting before you run them.

    Scale shape: one degree aggregate keyed on node, one histogram
    aggregate keyed on the ~64 possible buckets — both map-side combine."""
    ee = (
        edges.select(
            F.least(F.col(src_col), F.col(dst_col)).alias("a"),
            F.greatest(F.col(src_col), F.col(dst_col)).alias("b"),
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )
    deg = (
        ee.select(F.col("a").alias("node"))
        .unionByName(ee.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("long").alias("deg"))
    )
    return (
        deg.withColumn("bucket", (F.length(F.bin("deg")) - 1).cast("long"))
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_nodes"),
            F.min("deg").cast("long").alias("min_deg"),
            F.max("deg").cast("long").alias("max_deg"),
            F.sum("deg").cast("long").alias("sum_deg"),
        )
    )


def degree_assortativity(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    scale: int = 1_000_000,
) -> DataFrame:
    """Degree assortativity (Newman 2002) of the canonical undirected edge
    set — ONE row: the Pearson correlation of endpoint degrees over the
    SYMMETRIZED edge list ((deg_u, deg_v) and (deg_v, deg_u) per edge).
    Disassortative (r < 0) is the web-graph signature — hubs link to leaves;
    a crawl whose host graph turns assortative usually grew a link farm.

    Exact-integer discipline: every sum (n, Σx, Σy, Σxy, Σx², Σy²) is a
    BIGINT — emitted alongside ``r_i = round(scale·r)`` whose single float
    step (one sqrt + one division over identical integers) is the same IEEE
    math in either engine.  Zero-variance degenerate graphs emit the −2·scale
    sentinel (out of r's range) instead of NULL.

    Scale shape: a degree aggregate, one broadcastable degree join per
    endpoint, one global 1-row reduce — no window, no python."""
    ee = (
        edges.select(
            F.least(F.col(src_col), F.col(dst_col)).alias("a"),
            F.greatest(F.col(src_col), F.col(dst_col)).alias("b"),
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )
    deg = (
        ee.select(F.col("a").alias("node"))
        .unionByName(ee.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("long").alias("deg"))
    )
    sym = ee.unionByName(ee.select(F.col("b").alias("a"), F.col("a").alias("b")))
    pts = (
        sym.join(deg.select(F.col("node").alias("a"), F.col("deg").alias("x")), "a")
        .join(deg.select(F.col("node").alias("b"), F.col("deg").alias("y")), "b")
    )
    sums = pts.agg(
        F.count(F.lit(1)).cast("long").alias("n_points"),
        F.sum("x").cast("long").alias("sx"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast("long").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
        F.sum(F.col("y") * F.col("y")).cast("long").alias("syy"),
    )
    s = int(scale)
    return sums.select(
        "n_points",
        "sx",
        "sy",
        "sxy",
        "sxx",
        "syy",
        F.expr(
            f"CASE WHEN (n_points * sxx - sx * sx) > 0"
            f" AND (n_points * syy - sy * sy) > 0"
            f" THEN CAST(round({s} * (n_points * sxy - sx * sy)"
            f" / sqrt(CAST(n_points * sxx - sx * sx AS DOUBLE)"
            f" * CAST(n_points * syy - sy * sy AS DOUBLE))) AS BIGINT)"
            f" ELSE CAST({-2 * s} AS BIGINT) END"
        ).alias("r_i"),
    )


def hits(
    edges: DataFrame,
    iterations: int = 5,
    src_col: str = "src",
    dst_col: str = "dst",
    num_partitions: int | None = None,
) -> DataFrame:
    """(node, hub, auth) after `iterations` synchronous HITS steps
    (Kleinberg) on the DISTINCT directed edge set — the classic web-graph
    twin of PageRank: hubs point at good authorities, authorities are
    pointed at by good hubs.  For a crawl corpus the authority score ranks
    fetch-worthy hosts; the hub score ranks link-directory hosts.

    Per step: auth'(v) = Σ_{u→v} hub(u), then L1-normalize; hub'(u) =
    Σ_{u→v} auth'(v), then L1-normalize.  L1 (not the textbook L2) keeps
    the normalizer a plain SUM — associativity-stable enough for scaled-int
    gating, and the induced RANKING is identical (normalization is a global
    positive scalar either way).

    Same iterative discipline as :func:`pagerank` (src-repartitioned persisted
    edges; per-step materialization cuts the doubling lineage; normalizer is
    a broadcast 1-row frame, never a driver collect).  Cost per step:
    2·(|E| map + |V| reduce)."""
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
    if n == 0:
        e.unpersist()
        nodes.unpersist()
        return nodes.select(
            "node", F.lit(0.0).alias("hub"), F.lit(0.0).alias("auth")
        ).limit(0)
    scores = nodes.select(
        "node", F.lit(1.0 / n).alias("hub"), F.lit(1.0 / n).alias("auth")
    ).persist()
    scores.count()

    def _l1_normalized(df: DataFrame, col: str) -> DataFrame:
        tot = df.agg(F.sum(col).alias("_tot"))
        return df.crossJoin(F.broadcast(tot)).select(
            "node",
            *[c for c in ("hub", "auth") if c != col],
            (F.col(col) / F.col("_tot")).alias(col),
        )

    for _ in range(iterations):
        auth_raw = (
            e.join(scores.select(F.col("node").alias("src"), "hub"), "src")
            .groupBy(F.col("dst").alias("node"))
            .agg(F.sum("hub").alias("auth"))
        )
        auth = _l1_normalized(
            scores.select("node", "hub")
            .join(auth_raw, "node", "left")
            .select("node", "hub", F.coalesce("auth", F.lit(0.0)).alias("auth")),
            "auth",
        )
        hub_raw = (
            e.join(auth.select(F.col("node").alias("dst"), "auth"), "dst")
            .groupBy(F.col("src").alias("node"))
            .agg(F.sum("auth").alias("hub"))
        )
        # localCheckpoint (not persist): each step references the previous
        # scores ~3× (two joins + two normalizers), so the LOGICAL plan grows
        # ~3^k without lineage truncation — plan-string construction alone
        # OOMs the driver by step 5.  On a real cluster swap for a reliable
        # checkpoint dir if executor loss must be survivable mid-job.
        new_scores = _l1_normalized(
            auth.select("node", "auth")
            .join(hub_raw, "node", "left")
            .select("node", F.coalesce("hub", F.lit(0.0)).alias("hub"), "auth"),
            "hub",
        ).localCheckpoint()
        scores.unpersist()
        scores = new_scores
    e.unpersist()
    nodes.unpersist()
    return scores.select("node", "hub", "auth")


def kcore(
    edges: DataFrame,
    k: int = 2,
    src_col: str = "src",
    dst_col: str = "dst",
    num_partitions: int | None = None,
) -> DataFrame:
    """(node, degree) of the UNDIRECTED k-core: the maximal subgraph where
    every node has degree ≥ k, computed by iterative peeling (drop all
    nodes with degree < k, recompute, repeat to fixed point).  The standard
    web-graph denoising pass — pendant chains and weakly attached spam
    constellations peel away; the core is what link analysis should run on.

    Spark-first iterative shape: the live edge set is the loop state
    (symmetric closure of the distinct input edges, self-loops dropped);
    each round is one degree-agg + one broadcast-able semi-join of doomed
    nodes against both endpoints, materialized per round with the doomed
    count as the driver-side fixed-point test.  Rounds are data-bounded
    (each peels ≥1 node or stops), and each round's cost shrinks with the
    surviving edge set — worst case O(rounds·|E|) with map-side combine on
    the degree agg."""
    spark = edges.sparkSession
    n_part = num_partitions or spark.sparkContext.defaultParallelism
    directed = edges.select(
        F.col(src_col).alias("a"), F.col(dst_col).alias("b")
    ).filter(F.col("a") != F.col("b"))
    live = (
        directed.union(directed.select(F.col("b").alias("a"), F.col("a").alias("b")))
        .distinct()
        .repartition(n_part, "a")
        .persist()
    )
    live.count()
    while True:
        deg = live.groupBy("a").agg(F.count(F.lit(1)).cast("long").alias("degree"))
        doomed = deg.filter(F.col("degree") < k).select("a").persist()
        n_doomed = doomed.count()  # driver fixed-point test (1 scalar/round)
        if n_doomed == 0:
            doomed.unpersist()
            break
        # localCheckpoint: doomed is referenced by BOTH anti-joins and itself
        # derives from live, so without lineage truncation the plan tree
        # triples per round (see hits() for the failure mode).
        survivors = live.join(F.broadcast(doomed), "a", "left_anti").join(
            F.broadcast(doomed.select(F.col("a").alias("b"))), "b", "left_anti"
        ).localCheckpoint()
        live.unpersist()
        doomed.unpersist()
        live = survivors
    # |core-V|-sized; localCheckpoint so `live`'s cached blocks can be
    # released before returning (otherwise every call leaks a |E|-sized
    # persisted frame into the block manager).
    out = (
        live.groupBy(F.col("a").alias("node"))
        .agg(F.count(F.lit(1)).cast("long").alias("degree"))
        .localCheckpoint()
    )
    live.unpersist()
    return out


def deterministic_walks(
    edges: DataFrame,
    length: int = 4,
    src_col: str = "src",
    dst_col: str = "dst",
    num_partitions: int | None = None,
) -> DataFrame:
    """(start, step, node) random-walk corpus over the DISTINCT directed edge
    set — the DeepWalk/node2vec training-corpus generator, with the random
    step DERANDOMIZED so the walk set is reproducible and cross-engine
    gateable: at node u on step t the walker moves to
    ``sorted_neighbors(u)[ md5int32(u ‖ ':' ‖ t) mod outdeg(u) ]``.
    (Production walkers swap the md5 pick for a seeded PRNG per walk — the
    dataflow is identical; reproducible-by-construction is a feature for
    lineage anyway.)  One walk per graph node; step 0 is the start itself;
    walks terminate early at dangling nodes.

    100 TB shape: the neighbor-list build is one shuffle keyed on src
    (per-node lists bounded by out-degree — cap/sample top-N neighbors for
    Zipf-headed web graphs before calling); each step is then a join of the
    |V|-sized walker state against the neighbor table on the current node,
    localCheckpointed per step (state is referenced by both the emit and the
    advance).  Cost: length × (|V| join |V|)."""
    n_part = num_partitions or edges.sparkSession.sparkContext.defaultParallelism
    e = (
        edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
        .distinct()
        .persist()
    )
    nbrs = (
        e.groupBy("src")
        .agg(
            F.sort_array(F.collect_list("dst")).alias("nbrs"),
            F.count(F.lit(1)).cast("long").alias("nd"),
        )
        .repartition(n_part, "src")
        .persist()
    )
    starts = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    state = starts.select(
        F.col("node").alias("start"), F.col("node").alias("cur")
    ).localCheckpoint()
    frames = [
        state.select(
            "start", F.lit(0).cast("long").alias("step"), F.col("cur").alias("node")
        )
    ]
    for t in range(1, length + 1):
        pick = F.element_at(
            F.col("nbrs"),
            (
                F.conv(
                    F.substring(
                        F.md5(F.concat(F.col("cur"), F.lit(f":{t}"))), 1, 8
                    ),
                    16,
                    10,
                ).cast("long")
                % F.col("nd")
            ).cast("int")
            + 1,
        )
        state = (
            state.join(nbrs, state["cur"] == nbrs["src"], "inner")
            .select("start", pick.alias("cur"))
            .localCheckpoint()
        )
        frames.append(
            state.select(
                "start",
                F.lit(t).cast("long").alias("step"),
                F.col("cur").alias("node"),
            )
        )
    out = frames[0]
    for f in frames[1:]:
        out = out.unionByName(f)
    # every frame reads an eagerly-materialized localCheckpoint, so neither
    # cached input is needed to evaluate `out`
    e.unpersist()
    nbrs.unpersist()
    return out


def skipgram_pairs(
    walks: DataFrame,
    window: int = 2,
    walk_col: str = "start",
    step_col: str = "step",
    node_col: str = "node",
) -> DataFrame:
    """(center, context, n_pairs) skip-gram training pairs from a walk corpus
    (the DeepWalk step between :func:`deterministic_walks` and an embedding
    trainer): every ordered pair of nodes within ``window`` steps of each
    other inside the same walk, corpus-counted.

    Scale shape: ONE self-join keyed on the walk id — per-walk fan-out is
    bounded by length×2·window (walks are short by construction), and the
    count aggregate map-side combines into the co-occurrence vocabulary,
    which is what the trainer consumes.  No windows, no python."""
    l = walks.select(
        F.col(walk_col).alias("wid"),
        F.col(step_col).alias("si"),
        F.col(node_col).alias("center"),
    )
    r = walks.select(
        F.col(walk_col).alias("wid"),
        F.col(step_col).alias("sj"),
        F.col(node_col).alias("context"),
    )
    return (
        l.join(r, "wid")
        .filter(
            (F.abs(F.col("si") - F.col("sj")) >= 1)
            & (F.abs(F.col("si") - F.col("sj")) <= window)
        )
        .groupBy("center", "context")
        .agg(F.count(F.lit(1)).cast("long").alias("n_pairs"))
    )


def bounded_shortest_paths(
    edges: DataFrame,
    source,
    iterations: int = 6,
    src_col: str = "src",
    dst_col: str = "dst",
    weight_col: str = "w",
) -> DataFrame:
    """(node, cost) — minimum path cost from ``source`` reachable within
    ``iterations`` hops: synchronous Bellman-Ford relaxation.

    Spark-first iterative shape (same discipline as pagerank/hits above):
    edges deduped to min weight per (src, dst), repartitioned by src and
    persisted once; each round is one relax join + one min-agg, and the
    frontier frame is localCheckpoint-ed because it is referenced twice per
    round (carry-over + relaxation) — lineage would double per iteration
    otherwise.  Weights are INTEGER (exact min-agg, no float ordering
    ambiguity); nodes beyond the hop bound simply don't appear, which is the
    semantics a 100 TB graph needs anyway (unbounded closure is the
    transitive_closure operator's job).
    """
    spark = edges.sparkSession
    n_part = edges.sparkSession.sparkContext.defaultParallelism
    e = (
        edges.select(
            F.col(src_col).alias("src"),
            F.col(dst_col).alias("dst"),
            F.col(weight_col).cast("long").alias("w"),
        )
        .groupBy("src", "dst")
        .agg(F.min("w").alias("w"))
        .repartition(n_part, "src")
        .persist()
    )
    dist = spark.range(1).select(
        F.lit(source).alias("node"), F.lit(0).cast("long").alias("cost")
    )
    for _ in range(iterations):
        relaxed = (
            dist.withColumnRenamed("node", "src")
            .join(e, "src")
            .select(F.col("dst").alias("node"), (F.col("cost") + F.col("w")).alias("cost"))
        )
        dist = (
            dist.unionByName(relaxed)
            .groupBy("node")
            .agg(F.min("cost").cast("long").alias("cost"))
            .localCheckpoint()
        )
    e.unpersist()
    return dist


def harmonic_centrality(
    edges: DataFrame,
    max_hops: int = 6,
    src_col: str = "src",
    dst_col: str = "dst",
    scale: int = 1_000_000,
) -> DataFrame:
    """Bounded harmonic (in-)centrality over the DISTINCT directed edge set:
    per node, ``Σ_{u reaches v within max_hops, u≠v} ⌊scale / d(u,v)⌋`` with
    d = hop distance — the centrality that handles disconnected graphs
    (unreachable pairs contribute 0 instead of ∞, which is why it beats
    closeness on web graphs).  Also emits ``n_reach`` (how many sources
    reach the node).  EXACT integers: hop distances and ``scale // d``.

    All-pairs-bounded by design: the dist frame is (src, dst, d) — run this
    on the CONTRACTED host/entity graph (|V| ~ hosts), never on pages; the
    hop bound keeps each round one relax join + one min-agg, frontier
    localCheckpoint-ed per round (referenced twice: carry-over + relax)."""
    if max_hops < 1:
        raise ValueError("max_hops must be >= 1")
    e = (
        edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
        .filter(F.col("src") != F.col("dst"))
        .distinct()
        .persist()
    )
    dist = e.select("src", "dst", F.lit(1).cast("long").alias("d")).localCheckpoint()
    for _ in range(max_hops - 1):
        relaxed = dist.join(
            e.select(F.col("src").alias("dst"), F.col("dst").alias("nxt")), "dst"
        ).select("src", F.col("nxt").alias("dst"), (F.col("d") + 1).alias("d"))
        dist = (
            dist.unionByName(relaxed)
            .groupBy("src", "dst")
            .agg(F.min("d").alias("d"))
            .localCheckpoint()
        )
    out = (
        dist.filter(F.col("src") != F.col("dst"))
        .groupBy(F.col("dst").alias("node"))
        .agg(
            F.sum(F.expr(f"CAST({int(scale)} div d AS BIGINT)"))
            .cast("long")
            .alias("harmonic_i"),
            F.count(F.lit(1)).cast("long").alias("n_reach"),
        )
    )
    out = out.localCheckpoint()
    e.unpersist()
    return out


def node2vec_walks(
    edges: DataFrame,
    length: int = 3,
    return_w: int = 1,
    base_w: int = 2,
    inout_w: int = 4,
    src_col: str = "src",
    dst_col: str = "dst",
    num_partitions: int | None = None,
) -> DataFrame:
    """node2vec SECOND-ORDER biased walks (Grover & Leskovec 2016) — the
    BFS/DFS-interpolating upgrade of :func:`deterministic_walks`: at node
    ``cur`` having arrived from ``prev``, candidate x is weighted

    * ``return_w``  when x == prev            (1/p — return),
    * ``base_w``    when prev → x edge exists (distance 1),
    * ``inout_w``   otherwise                 (1/q — explore outward),

    with SMALL-INTEGER weights (the p=2, q=0.5 classic is 1/2/4): the
    weighted draw is an md5 index into the neighbor list EXPANDED by weight
    — integer-exact, reproducible, and expressible in both engines without
    a cumulative-sum fold.  Step 1 has no ``prev`` and uses the first-order
    md5 pick (standard node2vec initialization).  One walk per node; walks
    terminate early at dangling nodes.

    100 TB shape: per step, the walker state joins the neighbor table TWICE
    (cur → candidates, prev → the distance-1 test list) — both keyed on the
    node id; the expansion multiplies a neighbor LIST by ≤ max-weight, never
    the corpus; localCheckpoint per step (state feeds emit + advance).
    Degree caps for Zipf-headed webs apply upstream, as in
    deterministic_walks.
    """
    if length < 1:
        raise ValueError("length must be >= 1")
    if min(return_w, base_w, inout_w) < 1:
        raise ValueError("weights must be positive integers")
    n_part = num_partitions or edges.sparkSession.sparkContext.defaultParallelism
    e = (
        edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
        .distinct()
        .persist()
    )
    nbrs = (
        e.groupBy("src")
        .agg(
            F.sort_array(F.collect_list("dst")).alias("nbrs"),
            F.count(F.lit(1)).cast("long").alias("nd"),
        )
        .repartition(n_part, "src")
        .persist()
    )
    starts = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    frames = [
        starts.select(
            F.col("node").alias("start"),
            F.lit(0).cast("long").alias("step"),
            F.col("node").alias("node"),
        )
    ]
    # step 1: first-order pick
    pick1 = F.element_at(
        F.col("nbrs"),
        (
            F.conv(
                F.substring(F.md5(F.concat(F.col("cur"), F.lit(":1"))), 1, 8),
                16,
                10,
            ).cast("long")
            % F.col("nd")
        ).cast("int")
        + 1,
    )
    state = (
        starts.select(F.col("node").alias("start"), F.col("node").alias("cur"))
        .join(nbrs, F.col("cur") == F.col("src"), "inner")
        .select("start", F.col("cur").alias("prev"), pick1.alias("cur"))
        .localCheckpoint()
    )
    frames.append(
        state.select("start", F.lit(1).cast("long").alias("step"), F.col("cur").alias("node"))
    )
    cand = nbrs.select(F.col("src").alias("_c"), F.col("nbrs").alias("cand"))
    pnbt = nbrs.select(F.col("src").alias("_p"), F.col("nbrs").alias("pnb"))
    for t in range(2, length + 1):

        def weight(x):
            return (
                F.when(x == F.col("prev"), F.lit(return_w))
                .when(F.array_contains(F.col("pnb"), x), F.lit(base_w))
                .otherwise(F.lit(inout_w))
            )

        expanded = F.flatten(
            F.transform(
                F.col("cand"),
                lambda x: F.transform(F.sequence(F.lit(1), weight(x)), lambda y: x),
            )
        )
        r = (
            F.conv(
                F.substring(
                    F.md5(
                        F.concat(
                            F.col("prev"), F.lit("|"), F.col("cur"), F.lit(f":{t}")
                        )
                    ),
                    1,
                    8,
                ),
                16,
                10,
            ).cast("long")
            % F.size("_exp").cast("long")
        ).cast("int")
        state = (
            state.join(cand, state["cur"] == cand["_c"], "inner")
            .join(pnbt, state["prev"] == pnbt["_p"], "inner")
            .withColumn("_exp", expanded)
            .select(
                "start",
                F.col("cur").alias("prev"),
                F.element_at(F.col("_exp"), r + 1).alias("cur"),
            )
            .localCheckpoint()
        )
        frames.append(
            state.select(
                "start", F.lit(t).cast("long").alias("step"), F.col("cur").alias("node")
            )
        )
    out = frames[0]
    for fr in frames[1:]:
        out = out.unionByName(fr)
    out = out.localCheckpoint()
    e.unpersist()
    nbrs.unpersist()
    return out


def anf_hyperball(
    edges: DataFrame,
    radius: int,
    lgk: int = 12,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """Approximate neighborhood function via HyperBall (Boldi & Vigna 2013):
    for every node and r = 1..``radius``, the estimated number of DISTINCT
    nodes within out-distance ≤ r (the ball INCLUDES the node itself),
    computed by iterating HyperLogLog sketch unions along the edges —
    B_r(v) = B_{r−1}(v) ∪ ⋃_{v→w} B_{r−1}(w).

    This is THE web-graph-scale path for neighborhood-size curves: state is
    one fixed-size HLL sketch per node (vs the exact closure's O(reach)
    pair table), each round is one edge join + one sketch-union aggregate.
    Estimates come from Spark's DataSketches HLL, whose small-set coupon
    mode is exact well below 2^lgk — so at gate scale the rounded estimate
    EQUALS the exact ball size (the percentile_approx-at-max-accuracy twin
    pattern); at 10^12-node scale the same plan degrades gracefully to
    ~1.6%/√2^lgk relative error.

    Returns (node, r, ball_i) with ball_i = round(estimate) as BIGINT.

    100 TB shape: per round ONE node-keyed exchange of (node, sketch) rows
    (sketch ≤ 2^lgk·4 bits, fixed width) + hll_union_agg map-side combine;
    localCheckpoint per round (iterative-plan discipline)."""
    e = (
        edges.select(
            F.col(src_col).cast("string").alias("src"),
            F.col(dst_col).cast("string").alias("dst"),
        )
        .filter(F.col("src") != F.col("dst"))
        .distinct()
        .persist()
    )
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    state = (
        nodes.groupBy("node")
        .agg(F.hll_sketch_agg("node", F.lit(lgk)).alias("sk"))
        .localCheckpoint()
    )
    out: DataFrame | None = None
    for r in range(1, radius + 1):
        contrib = (
            e.join(state.withColumnRenamed("node", "dst"), "dst")
            .select(F.col("src").alias("node"), "sk")
        )
        state = (
            state.unionByName(contrib)
            .groupBy("node")
            .agg(F.hll_union_agg("sk").alias("sk"))
            .localCheckpoint()
        )
        level = state.select(
            "node",
            F.lit(r).cast("long").alias("r"),
            F.round(F.hll_sketch_estimate("sk")).cast("long").alias("ball_i"),
        )
        out = level if out is None else out.unionByName(level)
    e.unpersist()
    assert out is not None
    return out


def simrank_bounded(
    edges: DataFrame,
    rounds: int = 3,
    scale: int = 1_000_000,
    c_num: int = 8,
    c_den: int = 10,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """(a, b, s) bounded SimRank (Jeh & Widom 2002) after ``rounds``
    iterations of  s'(a,b) = C/(|I(a)|·|I(b)|) · Σ_{i∈I(a), j∈I(b)} s(i,j)
    with s(x,x) = ``scale`` — structural "similar pages are linked to by
    similar pages" similarity, the link-graph sibling of content near-dup.

    Integer-exact: C = c_num/c_den enters as ONE floor division per round
    (``(c_num·Σ) div (c_den·|I(a)|·|I(b)|)``), so an unrolled-SQL oracle
    reproduces every intermediate bit; rows flooring to 0 are dropped,
    which keeps the pair frame sparse AND is mirrored by the oracle.

    100 TB shape: the pair frame only ever contains pairs reachable through
    co-in-neighbor wedges (sparse in real link graphs — it grows from the
    diagonal outward, never materializing all n² pairs); each round is two
    equi-joins against the edge list + one pair-keyed aggregate, and the
    frame is localCheckpoint'ed per round (the 3-way-iterative-join plan
    blowup lesson).  Hub skew is the caller's job: cap in-degree upstream
    (same contract as _overlap_pairs) before handing edges in.
    """
    e = (
        edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )
    indeg = e.groupBy("dst").agg(F.count("*").alias("ind"))
    nodes = e.select(F.col("src").alias("node")).union(e.select("dst")).distinct()
    ident = nodes.select(
        F.col("node").alias("a"), F.col("node").alias("b"), F.lit(scale).cast("long").alias("s")
    )
    s = ident
    for _ in range(rounds):
        u = (
            s.join(e.select(F.col("src").alias("a"), F.col("dst").alias("na")), "a")
            .join(e.select(F.col("src").alias("b"), F.col("dst").alias("nb")), "b")
            .groupBy("na", "nb")
            .agg(F.sum("s").alias("t"))
            .join(indeg.select(F.col("dst").alias("na"), F.col("ind").alias("ia")), "na")
            .join(indeg.select(F.col("dst").alias("nb"), F.col("ind").alias("ib")), "nb")
            .filter(F.col("na") != F.col("nb"))
            .select(
                F.col("na").alias("a"),
                F.col("nb").alias("b"),
                F.expr(f"({c_num} * t) div ({c_den} * ia * ib)").cast("long").alias("s"),
            )
            .filter(F.col("s") > 0)
        )
        s = ident.unionByName(u).localCheckpoint(eager=True)
    return s


def boruvka_mst(
    edges: DataFrame,
    src_col: str = "a",
    dst_col: str = "b",
    weight_col: str = "w",
    max_rounds: int = 20,
) -> DataFrame:
    """(a, b, w) — minimum spanning forest by Borůvka's algorithm, THE
    distributed-MST choice (each round every component picks its cheapest
    incident edge, components merge, component count at least halves ⇒
    ≤ log₂|V| rounds of data-parallel work; Prim/Kruskal are inherently
    sequential).  Distinct weights are the caller's contract — they make
    the MSF unique, so the pick needs no cycle detection beyond the
    cross-component filter (with ties, Borůvka needs a total edge order;
    (w, a, b) struct min supplies one, but the ORACLE must mirror it, so
    the gate fixture derives distinct md5 weights instead).

    100 TB shape: per round, two node-keyed joins stamp component labels
    on the edge list, a map-side-combinable min(struct) per component
    picks the merge edges, and the contraction runs over the COMPONENT
    graph (≤ |components| edges — collapsing geometrically), via the
    size-adaptive connected_components.  Component labels localCheckpoint
    per round — the k_truss lesson: iterative multi-joins must truncate
    lineage or the logical plan grows 3^rounds.
    """
    from aiwhispr_spark.operators.canonicalize import connected_components

    ee = (
        edges.select(
            F.least(F.col(src_col), F.col(dst_col)).alias("ea"),
            F.greatest(F.col(src_col), F.col(dst_col)).alias("eb"),
            F.col(weight_col).alias("w"),
        )
        .filter(F.col("ea") != F.col("eb"))
        .groupBy("ea", "eb")
        .agg(F.min("w").alias("w"))
        .persist()
    )
    comp = (
        ee.select(F.col("ea").alias("node"))
        .unionByName(ee.select(F.col("eb").alias("node")))
        .distinct()
        .withColumn("comp", F.col("node"))
        .localCheckpoint()
    )
    chosen = None
    for _ in range(max_rounds):
        lab = (
            ee.join(comp.select(F.col("node").alias("ea"), F.col("comp").alias("ca")), "ea")
            .join(comp.select(F.col("node").alias("eb"), F.col("comp").alias("cb")), "eb")
            .filter(F.col("ca") != F.col("cb"))
        )
        inc = lab.select(F.col("ca").alias("c"), F.struct("w", "ea", "eb").alias("e")).unionByName(
            lab.select(F.col("cb").alias("c"), F.struct("w", "ea", "eb").alias("e"))
        )
        sel = (
            inc.groupBy("c")
            .agg(F.min("e").alias("e"))
            .select("e.ea", "e.eb", "e.w")
            .distinct()
            .localCheckpoint()
        )
        if sel.isEmpty():
            break
        chosen = sel if chosen is None else chosen.unionByName(sel).distinct().localCheckpoint()
        # contract along the freshly merged component graph: relabel every
        # node's component to the CC representative of its current label
        cg = (
            sel.join(comp.select(F.col("node").alias("ea"), F.col("comp").alias("ca")), "ea")
            .join(comp.select(F.col("node").alias("eb"), F.col("comp").alias("cb")), "eb")
            .select(F.col("ca").alias("a"), F.col("cb").alias("b"))
        )
        mapping = connected_components(cg, src="a", dst="b")
        comp = (
            comp.join(
                mapping.withColumnRenamed("alias", "comp").withColumnRenamed(
                    "component", "_new"
                ),
                "comp",
                "left",
            )
            .select("node", F.coalesce("_new", "comp").alias("comp"))
            .localCheckpoint()
        )
    ee.unpersist()
    if chosen is None:
        return ee.select(F.col("ea").alias("a"), F.col("eb").alias("b"), "w").limit(0)
    return chosen.select(F.col("ea").alias("a"), F.col("eb").alias("b"), "w")


def wl_color_refinement(
    triples: DataFrame,
    rounds: int = 2,
    subj_col: str = "subj",
    pred_col: str = "pred",
    obj_col: str = "obj",
) -> DataFrame:
    """1-dimensional Weisfeiler–Leman color refinement over the directed
    labeled triple graph (the RDF canonical-labeling / graph-isomorphism
    workhorse — URDNA2015's blank-node labeling and GNN expressiveness
    bounds are both 1-WL):

        c_{r+1}(v) = md5( c_r(v) || '|' ||
                          join_{sorted} (dir ⊕ pred ⊕ '=' ⊕ c_r(neighbor)) )

    with dir ∈ {'>', '<'} for out/in edges and the multiset sorted by
    (dir, pred, neighbor-color) — the sort makes the hash order-free, so
    two nodes get equal colors iff their r-hop neighborhood trees agree.
    Initial color is the constant '0' (structure-only refinement).

    Returns (node, wl_color) after ``rounds`` rounds; isolated nodes
    refine on the empty multiset.

    100 TB shape: each round is ONE edge-keyed exchange (messages carry
    (node, dir, pred, 32-char color) — never neighborhoods) + a node-keyed
    sorted-aggregate; rounds are bounded (2–3 in practice), each
    materialized by construction of the next join.  The classic
    MapReduce-WL layout."""
    nodes = (
        triples.select(F.col(subj_col).alias("node"))
        .unionByName(triples.select(F.col(obj_col).alias("node")))
        .distinct()
        .withColumn("wl_color", F.lit("0"))
    )
    edges = triples.select(
        F.col(subj_col).alias("s"), F.col(pred_col).alias("p"),
        F.col(obj_col).alias("o"),
    )
    for _ in range(rounds):
        cmap = nodes.select("node", "wl_color")
        out_msgs = edges.join(
            cmap.withColumnRenamed("node", "o").withColumnRenamed(
                "wl_color", "nbc"
            ),
            "o",
        ).select(F.col("s").alias("node"), F.lit(">").alias("dir"), "p", "nbc")
        in_msgs = edges.join(
            cmap.withColumnRenamed("node", "s").withColumnRenamed(
                "wl_color", "nbc"
            ),
            "s",
        ).select(F.col("o").alias("node"), F.lit("<").alias("dir"), "p", "nbc")
        sigs = (
            out_msgs.unionByName(in_msgs)
            .groupBy("node")
            .agg(
                F.concat_ws(
                    ",",
                    F.transform(
                        F.sort_array(
                            F.collect_list(F.struct("dir", "p", "nbc"))
                        ),
                        lambda t: F.concat(
                            t["dir"], t["p"], F.lit("="), t["nbc"]
                        ),
                    ),
                ).alias("sig")
            )
        )
        nodes = (
            nodes.join(sigs, "node", "left")
            .select(
                "node",
                F.md5(
                    F.concat(
                        F.col("wl_color"), F.lit("|"), F.coalesce("sig", F.lit(""))
                    )
                ).alias("wl_color"),
            )
        )
    return nodes


def wl_color_histogram(triples: DataFrame, rounds: int = 2) -> DataFrame:
    """Color-class histogram of the final WL round: (wl_color, n_nodes,
    example_node) — equal rows are structurally indistinguishable at
    radius ``rounds``; singleton classes are structurally unique."""
    colors = wl_color_refinement(triples, rounds=rounds)
    return (
        colors.groupBy("wl_color")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_nodes"),
            F.min("node").alias("example_node"),
        )
    )


def select_landmarks(
    edges: DataFrame,
    n_landmarks: int = 4,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """Top-degree landmark selection (the standard heuristic — Potamias
    et al. 2009 show high-degree landmarks dominate random picks): total
    degree desc, node asc tie-break, top ``n_landmarks``."""
    deg = (
        edges.select(F.col(src_col).alias("node"))
        .unionByName(edges.select(F.col(dst_col).alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("long").alias("deg"))
    )
    return (
        deg.orderBy(F.desc("deg"), "node").limit(n_landmarks).select("node")
    )


def multi_source_minhop(
    edges: DataFrame,
    sources: DataFrame,
    hops: int,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """(lm, node, d) — bounded min-hop distances from EVERY source in one
    synchronous BFS over the composite (lm, node) key: the production
    shape for landmark sketches (2 passes total — forward + reversed —
    instead of 2·L single-source runs).  Same iterative discipline as
    pagerank: per round one relax join + one min-agg, localCheckpoint to
    cut lineage."""
    e = (
        edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
        .where(F.col("src") != F.col("dst"))
        .distinct()
        .persist()
    )
    state = sources.select(
        F.col("node").alias("lm"),
        F.col("node").alias("node"),
        F.lit(0).cast("long").alias("d"),
    ).localCheckpoint()
    for _ in range(hops):
        nxt = state.join(e, state.node == e.src).select(
            "lm", e.dst.alias("node"), (F.col("d") + 1).alias("d")
        )
        state = (
            state.unionByName(nxt)
            .groupBy("lm", "node")
            .agg(F.min("d").alias("d"))
            .localCheckpoint()
        )
    e.unpersist()
    return state


def landmark_distance_eval(
    edges: DataFrame,
    n_landmarks: int = 4,
    hops: int = 6,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """Landmark distance-sketch evaluation: estimate
    d̂(u,v) = min_l d(u,l) + d(l,v) against the exact bounded distance.
    The sketch needs only 2·L·|V| distance rows (two multi-source BFS
    passes) versus all-pairs |V|² — THE scale substitution for distance
    queries on web graphs; the estimate is an admissible upper bound by
    the triangle inequality, exact whenever a shortest path passes a
    landmark (or an endpoint is one).

    Emits (u, v, exact_d, est_d, stretch_bp) per reachable pair u≠v;
    est_d = −1 when no landmark connects the pair within the hop bound
    (stretch −1 too).  The exact arm (transitive_closure) is the
    EVALUATION harness, not the production path."""
    from .graph_query import transitive_closure

    lms = select_landmarks(edges, n_landmarks, src_col, dst_col)
    fwd = multi_source_minhop(edges, lms, hops, src_col, dst_col)  # d(l, v)
    rev = multi_source_minhop(
        edges.select(
            F.col(dst_col).alias(src_col), F.col(src_col).alias(dst_col)
        ),
        lms,
        hops,
        src_col,
        dst_col,
    )  # reversed ⇒ d(u, l)
    est = (
        rev.select(F.col("node").alias("u"), F.col("lm"), F.col("d").alias("du"))
        .join(
            fwd.select(
                F.col("node").alias("v"), F.col("lm"), F.col("d").alias("dv")
            ),
            "lm",
        )
        .groupBy("u", "v")
        .agg(F.min(F.col("du") + F.col("dv")).alias("est_d"))
    )
    exact = transitive_closure(
        edges.select(src_col, dst_col), hops, src_col, dst_col
    ).select(
        F.col(src_col).alias("u"), F.col(dst_col).alias("v"),
        F.col("hops").cast("long").alias("exact_d"),
    )
    return (
        exact.join(est, ["u", "v"], "left")
        .where(F.col("u") != F.col("v"))
        .select(
            "u",
            "v",
            "exact_d",
            F.coalesce("est_d", F.lit(-1)).cast("long").alias("est_d"),
            F.when(
                F.col("est_d").isNotNull(),
                F.expr("est_d * 10000L div exact_d"),
            )
            .otherwise(F.lit(-1))
            .cast("long")
            .alias("stretch_bp"),
        )
    )
