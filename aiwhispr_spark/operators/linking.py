"""E5: embedding-based entity linking (mention → candidate).

Reuses the reference's cosine-similarity search semantics (Q1,
searchService.py:73-97; score convention 6_Semantic_Search.py:137-142) as a
*batch join*: every distinct mention is scored against every candidate entity,
and ``row_number() over (partition by mention order by score desc) = 1`` picks
the link — the set-oriented form of running the reference's top-k search once
per mention.

Scale strategy (two physical paths, same semantics):

* ``broadcast`` (default): candidate tables are small (10^5-10^6 entities ×
  64-768 floats fits executor memory) → broadcast-hash join, no shuffle of the
  mention side.  The mention side is first reduced to DISTINCT mentions —
  at 10^12 docs the distinct-mention set is orders of magnitude smaller than
  the triple stream, and the final link is re-attached with a second broadcast
  join keyed on the mention string.
* ``lsh``: when candidates outgrow a broadcast, block the crossing on shared
  alias shingles (same blocking machinery as canonicalize.py) so each mention
  meets only lexically plausible candidates instead of the full candidate set.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.udfs import alias_shingles_udf, cosine_cols_expr, embed_udf


def link_mentions(
    mentions: DataFrame,
    candidates: DataFrame,
    mention_col: str = "mention",
    cand_col: str = "entity",
    cand_vec_col: str = "embedding",
    strategy: str = "broadcast",
    min_score: float = 0.0,
) -> DataFrame:
    """Return (mention, entity, link_score) with exactly one row per distinct
    mention (argmax candidate by cosine; ties broken on entity asc)."""
    distinct_mentions = (
        mentions.select(F.col(mention_col).alias("mention"))
        .filter(F.col("mention").isNotNull())
        .distinct()
        .withColumn("mention_vec", embed_udf(F.col("mention")))
    )
    cands = candidates.select(
        F.col(cand_col).alias("entity"), F.col(cand_vec_col).alias("cand_vec")
    )

    if strategy == "broadcast":
        pairs = distinct_mentions.join(F.broadcast(cands))
    elif strategy == "lsh":
        m = distinct_mentions.withColumn(
            "shingle", F.explode(alias_shingles_udf(F.col("mention")))
        )
        c = cands.withColumn("shingle", F.explode(alias_shingles_udf(F.col("entity"))))
        pairs = m.join(c, "shingle").drop("shingle").dropDuplicates(["mention", "entity"])
    else:
        raise ValueError(f"unknown linking strategy: {strategy}")

    scored = pairs.withColumn("link_score", cosine_cols_expr("mention_vec", "cand_vec"))
    w = Window.partitionBy("mention").orderBy(F.col("link_score").desc(), F.col("entity"))
    return (
        scored.withColumn("_rn", F.row_number().over(w))
        .filter((F.col("_rn") == 1) & (F.col("link_score") >= min_score))
        .select("mention", "entity", "link_score")
    )


def link_triples(
    triples: DataFrame,
    candidates: DataFrame,
    cand_col: str = "entity",
    cand_vec_col: str = "embedding",
    strategy: str = "broadcast",
) -> DataFrame:
    """Attach subj_link / obj_link to a triple stream.  The (small) mention→link
    map is broadcast back onto the (huge) triple stream — the triple side never
    shuffles."""
    mentions = triples.select(F.col("subj").alias("mention")).unionByName(
        triples.select(F.col("obj").alias("mention"))
    )
    # persist: the subj and obj broadcast arms below would otherwise each
    # re-run the full linker (embed UDF + candidate join + window)
    links = link_mentions(
        mentions, candidates, cand_col=cand_col, cand_vec_col=cand_vec_col, strategy=strategy
    ).persist()
    subj_map = F.broadcast(
        links.select(
            F.col("mention").alias("subj"),
            F.col("entity").alias("subj_link"),
            F.col("link_score").alias("subj_link_score"),
        )
    )
    obj_map = F.broadcast(
        links.select(
            F.col("mention").alias("obj"),
            F.col("entity").alias("obj_link"),
            F.col("link_score").alias("obj_link_score"),
        )
    )
    return triples.join(subj_map, "subj", "left").join(obj_map, "obj", "left")


def fellegi_sunter_scores(
    cand: DataFrame,
    field_cols: list[str],
    label_col: str,
    scale: int = 1_000_000,
) -> DataFrame:
    """Classic probabilistic record linkage (Fellegi & Sunter 1969) over a
    candidate-pair frame: per-field agreement probabilities m_k = P(agree|M),
    u_k = P(agree|U) are estimated from the labeled pairs (``label_col`` —
    gold keys at gate scale, a clerical sample in production: the plug
    point), then every pair scores the likelihood ratio

        LR = Π_k  m_k/u_k          (field k agrees)
             Π_k  (1−m_k)/(1−u_k)  (field k disagrees)

    EXACT-INTEGER contract: Laplace (+1/+2) smoothing keeps every ratio
    finite, and the product is computed as SUCCESSIVE integer divisions in
    the given field order — ``x ← (x·num_k) div den_k`` starting from
    ``scale`` — so both engines produce bit-identical ``lr_i`` (document the
    field order; floor error is bounded by one ulp of the running scale per
    field).  Emits (…input cols…, pattern, lr_i).

    Overflow envelope: likelihood-ratio PRODUCTS explode by construction
    (that is why production Fellegi–Sunter sums log2 weights instead).  The
    m/u counts land as a bounded 1-row driver collect (the pagerank-`n`
    pattern), so this function computes the worst-case intermediate
    ``lr_max·num_max`` up front and raises ValueError when it could exceed
    2^63 — Spark's non-ANSI mode would silently wrap negative while DuckDB
    errors, a cross-engine divergence that must never reach a gate.  At that
    point switch to the log-weight form (float log2 sum) or drop `scale`.

    Scale shape: ONE map-side-combinable aggregate reduces the pair stream
    to the 2+2k m/u counts (driver scalars — that is what enables the
    overflow pre-check), which then enter the scoring pass as LITERALS:
    scoring is pure JVM expressions, the pair stream never shuffles and
    never joins."""
    n_f = len(field_cols)
    if n_f == 0:
        raise ValueError("field_cols must be non-empty")
    lab = F.col(label_col)
    aggs = [
        F.sum(F.when(lab, 1).otherwise(0)).cast("long").alias("nm"),
        F.sum(F.when(~lab, 1).otherwise(0)).cast("long").alias("nu"),
    ]
    for i, c in enumerate(field_cols):
        aggs.append(
            F.sum(F.when(lab & F.col(c), 1).otherwise(0)).cast("long").alias(f"ma_{i}")
        )
        aggs.append(
            F.sum(F.when((~lab) & F.col(c), 1).otherwise(0))
            .cast("long")
            .alias(f"ua_{i}")
        )
    row = cand.agg(*aggs).collect()[0]  # bounded driver scalars (2+2k counts)
    nm, nu = row["nm"], row["nu"]
    # worst-case envelope check (docstring): track the max possible running
    # lr and the max per-field numerator it gets multiplied by
    lr_max = int(scale)
    for i in range(n_f):
        ma, ua = row[f"ma_{i}"], row[f"ua_{i}"]
        nums = (
            (ma + 1) * (nu + 2),
            (nm + 1 - ma) * (nu + 2),
        )
        dens = ((nm + 2) * (ua + 1), (nm + 2) * (nu + 1 - ua))
        if lr_max * max(nums) >= 2**63:
            raise ValueError(
                "fellegi_sunter_scores: integer likelihood product could "
                "exceed 2^63 (field %d); use log-weight scoring or a smaller "
                "scale" % i
            )
        lr_max = max(
            lr_max * nums[0] // dens[0], lr_max * nums[1] // dens[1], lr_max
        )
    scored = cand.withColumn(
        "pattern",
        F.concat(*[F.when(F.col(c), F.lit("1")).otherwise(F.lit("0")) for c in field_cols]),
    ).withColumn("lr_i", F.lit(int(scale)).cast("long"))
    for i, c in enumerate(field_cols):
        ma, ua = row[f"ma_{i}"], row[f"ua_{i}"]
        num = (
            f"CASE WHEN {c} THEN {(ma + 1) * (nu + 2)}"
            f" ELSE {(nm + 1 - ma) * (nu + 2)} END"
        )
        den = (
            f"CASE WHEN {c} THEN {(nm + 2) * (ua + 1)}"
            f" ELSE {(nm + 2) * (nu + 1 - ua)} END"
        )
        scored = scored.withColumn(
            "lr_i", F.expr(f"CAST((lr_i * ({num})) div ({den}) AS BIGINT)")
        )
    return scored


def snm_candidate_pairs(
    records: DataFrame,
    key_col: str,
    id_col: str = "id",
    window: int = 3,
) -> DataFrame:
    """Sorted-neighborhood blocking (Hernández & Stolfo 1998): sort all
    records by a fuzzy blocking key, slide a ``window``-record frame down
    the order, and emit every in-window pair as an ER candidate.  The
    classic complement to hash/LSH blocking — typo'd keys land in ADJACENT
    sort positions even when token-level hashing scatters them into
    different buckets.

    Returns (id_a, id_b, gap) with gap = rank distance ∈ [1, window−1];
    order is the (key, id) total order (id tie-break — required for
    determinism, same contract as global_row_number).

    100 TB shape: the global sort is ranking.global_row_number's
    range-Exchange dataflow — NO single-partition window; the neighborhood
    join is ONE equi-join on rank+d probes (d exploded from a window-sized
    literal array), so exchanges carry (id, rank) pairs only and the output
    is exactly (window−1)·n pairs — never a block cross-product."""
    if window < 2:
        raise ValueError("window must be >= 2 (a 1-window has no pairs)")
    from .ranking import global_row_number

    ranked = global_row_number(
        records.select(F.col(id_col).alias("id"), F.col(key_col).alias("key")),
        [F.col("key"), F.col("id")],
        rank_col="rk",
    ).select("id", "rk")
    probes = ranked.select(
        F.col("id").alias("id_a"),
        F.col("rk").alias("rk_a"),
        F.explode(
            F.array([F.lit(d) for d in range(1, window)])
        ).alias("gap"),
    ).withColumn("rk", F.col("rk_a") + F.col("gap"))
    return (
        probes.join(
            ranked.select(F.col("id").alias("id_b"), "rk"), "rk"
        )
        .select("id_a", "id_b", F.col("gap").cast("long").alias("gap"))
    )


def collective_disambiguation(
    mentions: DataFrame,
    priors: DataFrame,
    relatedness: DataFrame,
    self_rel_i: int = 10000,
    rel_col: str = "rel_i",
) -> DataFrame:
    """(doc, mention_id, surface, entity, score_i) — one-round collective
    entity disambiguation (the ICA approximation of AIDA/TagMe coherence
    objectives): each mention's candidates score

        score = prior_i + Σ_{other mentions m'} rel(candidate, top(m'))

    where top(m') is m's top-PRIOR candidate (the fixed context of the
    round) and rel comes from a Milne–Witten-style relatedness table
    (symmetric pairs a < b with the score in ``rel_col`` — pass
    ``milne_witten_relatedness`` output with ``rel_col="mw_mi"``; its −1
    undefined-denominator sentinel is clamped to 0, never subtracted); a
    candidate IDENTICAL to a context entity scores ``self_rel_i`` (identity
    is maximal coherence).  Argmax per mention, ties to the lexicographic
    entity — fully deterministic, every term an exact int.

    One round is the standard scalable compromise: full joint inference is
    NP-hard, iterated ICA is order-sensitive; one fixed-context round is
    deterministic and captures the dominant "my neighbors' obvious
    readings" signal.

    A mention whose surface has NO prior candidates emits NO row (NIL —
    visible absence, same contract as spell_correct_terms): linking
    coverage is ``|output| / |mentions|``, and NIL handling (create-entity
    vs drop) is the caller's policy, not this operator's.

    100 TB shape: context and candidates join doc-keyed (per-doc mention
    count is small — the quadratic is within a page); relatedness joins on
    the unordered pair key; the argmax is a mention-partitioned window.
    """
    w_top = Window.partitionBy("surface").orderBy(F.col("prior_i").desc(), F.col("entity"))
    top1 = (
        priors.withColumn("_rn", F.row_number().over(w_top))
        .filter(F.col("_rn") == 1)
        .select("surface", F.col("entity").alias("ctx_entity"))
    )
    ctx = mentions.join(top1, "surface").select(
        "doc", F.col("mention_id").alias("ctx_mid"), "ctx_entity"
    )
    cands = mentions.join(priors, "surface")
    pairs = (
        cands.select("doc", "mention_id", "entity")
        .join(ctx, "doc")
        .filter(F.col("mention_id") != F.col("ctx_mid"))
        .withColumn("pa", F.least("entity", "ctx_entity"))
        .withColumn("pb", F.greatest("entity", "ctx_entity"))
    )
    rel = relatedness.select(
        F.col("a").alias("pa"),
        F.col("b").alias("pb"),
        F.greatest(F.col(rel_col), F.lit(0)).alias("rel_i"),
    )
    coh = (
        pairs.join(rel, ["pa", "pb"], "left")
        .select(
            "doc",
            "mention_id",
            "entity",
            F.when(F.col("entity") == F.col("ctx_entity"), F.lit(self_rel_i))
            .otherwise(F.coalesce(F.col("rel_i"), F.lit(0)))
            .alias("_r"),
        )
        .groupBy("doc", "mention_id", "entity")
        .agg(F.sum("_r").cast("long").alias("_coh"))
    )
    scored = cands.join(coh, ["doc", "mention_id", "entity"], "left").select(
        "doc",
        "mention_id",
        "surface",
        "entity",
        (F.col("prior_i") + F.coalesce(F.col("_coh"), F.lit(0))).cast("long").alias("score_i"),
    )
    w_pick = Window.partitionBy("doc", "mention_id").orderBy(
        F.col("score_i").desc(), F.col("entity")
    )
    return (
        scored.withColumn("_rn", F.row_number().over(w_pick))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
