"""Count-min sketch (Cormode/Muthukrishnan '05) token-frequency estimation —
the fixed-memory rung of the sketch family next to HLL distinct counts
(hll_distinct_tokens) and the t-digest percentile twin
(chars_percentiles_approx).

Scale design: the sketch state is depth x width counters (4 x 256 = 1 KiB of
longs here; a production 4 x 2^20 is still ~32 MiB) regardless of input
size, built with one map-side-combinable aggregation.  Token occurrences are
pre-counted per token BEFORE fanning out over the depth rows, so the shuffle
carries (token, cnt) once, not depth copies of the raw stream.  Estimates
broadcast the counter table (it is tiny by construction) against any
candidate set — no second pass over the corpus.

Determinism: bucket hashes are md5-prefix ints (('0x'||substr(md5,1,8)) in
DuckDB ≡ conv(substring(md5,1,8),16,10) in Spark), so the whole sketch —
counters AND estimates — is exactly reproducible in SQL and hash-gateable,
unlike the opaque datasketches binaries.  CMS guarantees est >= true; the
gate emits over_i = est - true so a negative value (impossible unless the
hash families diverge) or a changed collision pattern flips the hash.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _bucket(row: Column, tok: Column, width: int) -> Column:
    """Row-seeded bucket: 32-bit md5-prefix of 'r:token' mod width."""
    h = F.conv(F.substring(F.md5(F.concat(row.cast("string"), F.lit(":"), tok)), 1, 8), 16, 10)
    return (h.cast("long") % width).cast("int")


def token_counts(tokens: DataFrame, token_col: str = "tok") -> DataFrame:
    """(token, cnt) exact occurrence counts — the one corpus aggregation the
    sketch family shares (build it once, feed counters AND true counts).

    NULL tokens drop up front: a downstream equi-join on the token would
    push the same isnotnull filter into ITS subtree only, making the two
    aggregate subplans canonically different and defeating Catalyst's
    exchange reuse — with the filter here, every consumer shares ONE
    shuffle of the token stream."""
    return (
        tokens.filter(F.col(token_col).isNotNull())
        .groupBy(token_col)
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )


def cms_counters(
    tokens: DataFrame,
    token_col: str = "tok",
    depth: int = 4,
    width: int = 256,
    counts: DataFrame | None = None,
) -> DataFrame:
    """Build the sketch: (r, bucket, c) counter rows from a token stream.

    Occurrences are pre-aggregated per token, then fanned out over the depth
    rows — the fan-out multiplies DISTINCT tokens, not the stream.  Pass a
    pre-built :func:`token_counts` frame via ``counts`` to share that
    aggregation with other consumers (cms_heavy_hitters does).
    """
    cnts = token_counts(tokens, token_col) if counts is None else counts
    rows = cnts.select(
        F.col(token_col),
        "cnt",
        F.explode(F.array(*[F.lit(r) for r in range(depth)])).alias("r"),
    )
    return (
        rows.groupBy("r", _bucket(F.col("r"), F.col(token_col), width).alias("bucket"))
        .agg(F.sum("cnt").cast("long").alias("c"))
    )


def cms_estimate(
    counters: DataFrame,
    candidates: DataFrame,
    token_col: str = "tok",
    depth: int = 4,
    width: int = 256,
    assume_distinct: bool = False,
) -> DataFrame:
    """Point-query the sketch for each candidate token: min over depth rows.

    The counter table is broadcast (fixed size by construction); the join is
    therefore shuffle-free on the candidate side.  Pass
    ``assume_distinct=True`` when the candidate frame is already one row per
    token (e.g. an aggregate output) — the redundant distinct would otherwise
    re-shuffle the candidates AND break exchange reuse with the frame that
    produced them.
    """
    cand = candidates.select(token_col)
    if not assume_distinct:
        cand = cand.distinct()
    rows = cand.select(
        F.col(token_col),
        F.explode(F.array(*[F.lit(r) for r in range(depth)])).alias("r"),
    )
    rows = rows.withColumn("bucket", _bucket(F.col("r"), F.col(token_col), width))
    return (
        rows.join(F.broadcast(counters), ["r", "bucket"])
        .groupBy(token_col)
        .agg(F.min("c").cast("long").alias("est"))
    )


def cms_heavy_hitters(
    tokens: DataFrame,
    token_col: str = "tok",
    depth: int = 4,
    width: int = 256,
    k: int = 20,
) -> DataFrame:
    """Top-k tokens by CMS estimate, with the true count and the overcount
    (est - true >= 0 always, by the CMS one-sided error guarantee).

    Ties break on the token string so the top-k cut is deterministic.

    The corpus is scanned and aggregated ONCE: the same token_counts frame
    feeds the sketch build and the estimate probe, and the probe CARRIES the
    true count through the explode (instead of re-deriving it through
    cms_estimate + join, which column pruning would rewrite into an extra
    distinct scan of the stream) — so Catalyst reuses the one count exchange
    (ReusedExchange, plan-asserted in tests) and everything downstream works
    on |distinct tokens|-sized frames."""
    cnts = token_counts(tokens, token_col)
    counters = cms_counters(tokens, token_col, depth, width, counts=cnts)
    rows = cnts.select(
        F.col(token_col),
        "cnt",
        F.explode(F.array(*[F.lit(r) for r in range(depth)])).alias("r"),
    )
    rows = rows.withColumn("bucket", _bucket(F.col("r"), F.col(token_col), width))
    out = (
        rows.join(F.broadcast(counters), ["r", "bucket"])
        .groupBy(token_col)
        .agg(
            F.min("c").cast("long").alias("est_l"),
            F.min("cnt").cast("long").alias("true_l"),
        )
        .select(
            token_col,
            "est_l",
            "true_l",
            (F.col("est_l") - F.col("true_l")).cast("long").alias("over_l"),
        )
    )
    return out.orderBy(F.desc("est_l"), token_col).limit(k)


def kmv_sketch_estimates(
    docs: DataFrame,
    group_col: str = "source",
    text_col: str = "text",
    k: int = 16,
) -> DataFrame:
    """(grp, k_used, kth_hash, est_distinct, exact_distinct, err_i) — KMV
    (k-minimum-values / bottom-k) distinct-count sketch per group, PLUS an
    '(all)' row whose sketch is the MERGE of the per-group bottom-k sets
    (the KMV union property: bottom-k of a union = bottom-k of the merged
    bottom-k lists — Beyer et al., SIGMOD'07).  est = (k-1)·2^52 div
    kth_min over 13-hex-char md5 values (52 bits keeps (k-1)·2^52 inside
    int64); groups with < k distinct tokens fall back to their exact count
    (k_used = n, est = n — the standard small-set exact regime).

    Determinism: md5 is identical in both engines; the sketch, the
    estimate, and the scaled error are all exact integers.

    100 TB shape: one distinct on (grp, token-hash) — 8-byte keys, never
    text — then a rank-k window that compiles to WindowGroupLimit
    (map-side partial bottom-k, so each partition ships ≤ k rows per
    group); the '(all)' merge re-ranks |groups|·k rows on ONE key.  Exact
    distincts ride the same shuffles.  No collect; estimates land in the
    |groups|+1-row frame.
    """
    toks = (
        docs.select(
            F.col(group_col).alias("grp"),
            F.explode(F.split(F.lower(F.col(text_col)), r"\s+")).alias("tok"),
        )
        .filter(F.col("tok") != "")
        .select(
            "grp",
            F.conv(F.substring(F.md5("tok"), 1, 13), 16, 10)
            .cast("long")
            .alias("h"),
        )
        .distinct()
    )
    w = Window.partitionBy("grp").orderBy("h")
    kept = toks.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") <= k)
    # union merge: bottom-k of the merged per-group bottom-k sets — a
    # |groups|·k frame, so TakeOrderedAndProject (orderBy+limit), not a
    # degenerate single-partition window
    merged = (
        kept.select("h").distinct().orderBy("h").limit(k)
        .select(F.lit("(all)").alias("grp"), "h")
    )
    sketch = kept.select("grp", "h").unionByName(merged)
    per = sketch.groupBy("grp").agg(
        F.count(F.lit(1)).cast("long").alias("k_used"),
        F.max("h").alias("kth_hash"),
    )
    exact_g = toks.groupBy("grp").agg(
        F.countDistinct("h").cast("long").alias("exact_distinct")
    )
    exact_all = toks.select("h").distinct().agg(
        F.count(F.lit(1)).cast("long").alias("exact_distinct")
    ).select(F.lit("(all)").alias("grp"), "exact_distinct")
    exact = exact_g.unionByName(exact_all)
    est = F.when(
        F.col("k_used") < k, F.col("exact_distinct")
    ).otherwise(F.expr(f"((k_used - 1) * {1 << 52}) div kth_hash"))
    out = per.join(exact, "grp").select(
        "grp",
        "k_used",
        "kth_hash",
        est.cast("long").alias("est_distinct"),
        "exact_distinct",
    )
    return out.withColumn(
        "err_i",
        F.expr(
            "(abs(est_distinct - exact_distinct) * 10000) div exact_distinct"
        ).cast("long"),
    )


def kmv_pair_jaccard(
    docs: DataFrame,
    group_col: str = "source",
    text_col: str = "text",
    k: int = 16,
    shingle: int = 3,
    scale: int = 10_000,
) -> DataFrame:
    """Pairwise Jaccard / intersection ESTIMATES between group shingle
    sets from merged KMV sketches (Beyer et al., SIGMOD'07 §5 — the set
    operation HLL cannot do): for groups (a, b),

        K      = bottom-k of (sketch_a ∪ sketch_b)
        ρ̂      = |K ∩ sketch_a ∩ sketch_b| / |K|          (Jaccard)
        |A∪B|̂  = (|K|−1)·2^52 div max(K)   (or exact |K| in the small regime)
        |A∩B|̂  = n_shared · |A∪B|̂ div |K|

    — all exact integer arithmetic over 52-bit md5 prefixes, so the
    estimate itself is engine-reproducible (the gate pins the ESTIMATOR,
    not a tolerance).

    100 TB shape: per-group sketches come from one distinct + one
    WindowGroupLimit bottom-k (each partition ships ≤ k rows/group);
    everything pairwise then operates on |G|·k rows — the G² blowup
    touches k-sized sketches, never the corpus.  Pairs frame broadcasts."""
    t = F.filter(F.split(F.lower(F.col(text_col)), r"\s+"), lambda x: x != "")

    def shingles(tt):
        def mk(j):
            return F.concat_ws(" ", F.slice(tt, j, shingle))

        return F.when(
            F.size(tt) >= shingle,
            F.transform(F.sequence(F.lit(1), F.size(tt) - (shingle - 1)), mk),
        ).otherwise(F.array().cast("array<string>"))

    toks = (
        docs.select(F.col(group_col).alias("grp"), F.explode(shingles(t)).alias("s"))
        .select(
            "grp",
            F.conv(F.substring(F.md5("s"), 1, 13), 16, 10).cast("long").alias("h"),
        )
        .distinct()
    )
    w = Window.partitionBy("grp").orderBy("h")
    kept = toks.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") <= k)
    groups = kept.select("grp").distinct()
    pairs = (
        groups.alias("ga")
        .join(groups.alias("gb"), F.col("ga.grp") < F.col("gb.grp"))
        .select(F.col("ga.grp").alias("grp_a"), F.col("gb.grp").alias("grp_b"))
    )
    cand = (
        F.broadcast(pairs)
        .join(
            kept.select(F.col("grp").alias("g"), "h"),
            (F.col("g") == F.col("grp_a")) | (F.col("g") == F.col("grp_b")),
        )
        .groupBy("grp_a", "grp_b", "h")
        .agg(
            F.max((F.col("g") == F.col("grp_a")).cast("int")).alias("in_a"),
            F.max((F.col("g") == F.col("grp_b")).cast("int")).alias("in_b"),
        )
    )
    wp = Window.partitionBy("grp_a", "grp_b").orderBy("h")
    topk = cand.withColumn("_rn", F.row_number().over(wp)).filter(F.col("_rn") <= k)
    agg = topk.groupBy("grp_a", "grp_b").agg(
        F.count(F.lit(1)).cast("long").alias("k_eff"),
        F.sum((F.col("in_a") * F.col("in_b")).cast("long")).alias("n_shared"),
        F.max("h").alias("kth_hash"),
    )
    est_union = F.when(
        F.col("k_eff") < k, F.col("k_eff")
    ).otherwise(F.expr(f"((k_eff - 1) * {1 << 52}) div kth_hash"))
    return agg.select(
        "grp_a",
        "grp_b",
        "k_eff",
        "n_shared",
        F.expr(f"n_shared * {scale}L div k_eff").alias("jaccard_i"),
        est_union.cast("long").alias("est_union"),
        F.expr(
            f"n_shared * (CASE WHEN k_eff < {k} THEN k_eff "
            f"ELSE ((k_eff - 1) * {1 << 52}) div kth_hash END) div k_eff"
        )
        .cast("long")
        .alias("est_inter"),
    )


def ams_f2_sketch(
    df: DataFrame,
    item_col: str,
    n_estimators: int = 8,
) -> DataFrame:
    """AMS second-frequency-moment sketch (Alon–Matias–Szegedy '96): each
    estimator j keeps one counter Z_j = Σ_x s_j(x)·f(x) with a ±1 hash sign
    s_j(x); E[Z²] = F₂ = Σ f(x)² — the self-join size / skew statistic a
    planner wants without holding per-key counts.  Signs derive from
    md5(j:x) first-nibble parity (cross-engine deterministic, the
    kmv/minhash_md5 convention).

    Output one row per estimator: (est_id, z, f2_est = z²) plus the exact
    F₂ alongside (f2_exact) — the probe-all ≡ exact gate pattern: the test
    pins mean(f2_est) within bounds of f2_exact, the oracle hashes the
    whole per-estimator state.  All BIGINT; z² stays in range while
    Σf < 3e9 — at web scale the counters move to DECIMAL(38) (docstring
    contract, same as the lift bound in rulemine).

    100 TB shape: ONE (item, cnt) aggregate, an 8-way literal explode over
    the ITEM-KEYED counts (never the raw stream), then an 8-key sum —
    map-side combinable end to end; the sketch is mergeable by addition."""
    cnt = df.groupBy(F.col(item_col).alias("item")).agg(
        F.count(F.lit(1)).cast("long").alias("cnt")
    )
    ests = F.array(*[F.lit(j) for j in range(n_estimators)])
    signed = cnt.select(
        "item",
        "cnt",
        F.explode(ests).alias("est_id"),
    ).select(
        "est_id",
        F.when(
            F.conv(F.substring(F.md5(F.concat_ws(":", F.col("est_id"), F.col("item"))), 1, 1), 16, 10)
            .cast("long") % 2 == 0,
            F.col("cnt"),
        )
        .otherwise(-F.col("cnt"))
        .alias("signed"),
    )
    z = signed.groupBy("est_id").agg(F.sum("signed").cast("long").alias("z"))
    exact = cnt.agg(F.sum(F.col("cnt") * F.col("cnt")).cast("long").alias("f2_exact"))
    return (
        z.crossJoin(F.broadcast(exact))
        .select(
            F.col("est_id").cast("long").alias("est_id"),
            "z",
            (F.col("z") * F.col("z")).cast("long").alias("f2_est"),
            "f2_exact",
        )
        .orderBy("est_id")
    )
