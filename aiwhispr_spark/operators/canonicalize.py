"""E6: alias canonicalization = MinHash-LSH blocking + connected components.

New component (the reference has no canonicalization; SURVEY.md §7.1 E6),
built from idiomatic-Spark parts:

1. **Blocking** — every alias is shingled (char 3-grams of its normalized
   form, triples.alias_shingles).  MinHash signatures are computed entirely
   JVM-side: ``xxhash64(shingle, seed=i)`` per permutation, ``min`` per
   signature row, grouped into bands (banding à la MMDS ch.3).  Aliases
   sharing any band bucket become candidate pairs — a self-equi-join on
   (band_id, band_hash), which shuffles only (alias, band) rows, never the
   full cross product.
2. **Verification** — candidate pairs are kept when true shingle-set Jaccard
   ≥ threshold (JVM-side: array_intersect/array_union sizes), or when the
   normalized forms are equal / share a numeric stem (``entity7`` ~ ``e7``).
3. **Connected components** — min-label propagation with label-path
   compression (the alternating-star trick's cheap cousin: each round also
   re-points labels at their label's label, so convergence is O(log diameter)
   rounds).  Each round is one shuffle on the label key; DataFrames are
   localCheckpointed per round to truncate the lineage that would otherwise
   grow unboundedly — the standard iterative-algorithm discipline on Spark.
4. **Election** — canonical id = lexicographically-smallest alias of the
   component (deterministic, content-derived: no uuid1, SURVEY.md §7.4).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.udfs import alias_shingles_udf, normalize_alias_udf

DEFAULT_BANDS = 8
DEFAULT_ROWS_PER_BAND = 2  # 16 minhashes; b=8, r=2 → s-curve threshold ≈ (1/8)^(1/2) ≈ 0.35
# Verify threshold is deliberately strict: alias surface forms are SHORT, and
# shingle Jaccard between different entities ("entity4" vs "entity41") is high;
# the exact-norm and numeric-stem blocking channels carry the recall instead.
DEFAULT_JACCARD = 0.85


def _with_shingles(aliases: DataFrame, alias_col: str) -> DataFrame:
    return (
        aliases.select(F.col(alias_col).alias("alias"))
        .filter(F.col("alias").isNotNull())
        .distinct()
        .withColumn("norm", normalize_alias_udf(F.col("alias")))
        .withColumn("shingles", alias_shingles_udf(F.col("alias")))
        .filter(F.size("shingles") > 0)
    )


def _prepared_base(aliases: DataFrame, alias_col: str) -> DataFrame:
    """Shingled/normalized alias base, persisted and RIGHT-SIZED: inheriting
    spark.sql.shuffle.partitions would fan a few-hundred-alias frame into
    bands×partitions map tasks (observed 640), each paying the ~250 ms
    python-worker floor.  count() doubles as the persist trigger."""
    base = _with_shingles(aliases, alias_col).persist()
    n_aliases = base.count()
    cap = int(base.sparkSession.conf.get("spark.sql.shuffle.partitions", "64"))
    return base.coalesce(max(2, min(cap, n_aliases // 20_000 + 1)))


def _blocking_keyed(
    base: DataFrame, bands: int, rows_per_band: int
) -> DataFrame:
    """(alias, bkey) blocking rows — multi-pass (SparkER-style): LSH band
    buckets ∪ exact normalized key ∪ numeric stem ("entity7" ~ "e7").  Each
    channel emits skinny rows; norm/shingle attributes re-join only on the
    candidate-sized pair set, so the blocking shuffle never carries shingle
    arrays (×bands, the 100 TB scale-killer).  LSH keys come from ONE array
    expansion, not a bands-way union (a K-branch union multiplies map-side
    partitions by K).

    Minhash seeds bind via minhash_signature's closure factory — a 2-arg
    transform lambda would silently receive the ELEMENT INDEX as its second
    argument (CLAUDE.md arity note), collapsing every hash function into
    one."""
    from .dedup import minhash_signature

    n_hashes = bands * rows_per_band
    signed = base.select("alias", *minhash_signature(F.col("shingles"), n_hashes))
    lsh_keys = F.array(
        *[
            F.concat(
                F.lit(f"lsh:{b}:"),
                F.xxhash64(
                    *[F.col(f"mh{b * rows_per_band + r}") for r in range(rows_per_band)]
                ).cast("string"),
            )
            for b in range(bands)
        ]
    )
    stem = F.regexp_extract(F.col("norm"), r"^(?:entity|e)([0-9]+)$", 1)
    return (
        signed.select("alias", F.explode(lsh_keys).alias("bkey"))
        .unionByName(base.select("alias", F.concat(F.lit("norm:"), F.col("norm")).alias("bkey")))
        .unionByName(
            base.filter(stem != "").select("alias", F.concat(F.lit("stem:"), stem).alias("bkey"))
        )
    )


def _verify_pairs(
    cand: DataFrame, attrs: DataFrame, jaccard_threshold: float
) -> DataFrame:
    """Keep candidate pairs that are true matches: equal normalized forms,
    shared numeric stem, or shingle Jaccard ≥ threshold — with the numeric-
    identifier VETO: aliases that both carry a numeric stem but with
    DIFFERENT numbers are distinct entities no matter how much their
    character shingles overlap — "entity14" vs "entity140" share 6/7
    shingles (J=0.857 ≥ any practical threshold) purely because one id is a
    prefix of the other.  (Round-1's broken seed binding hid this: the
    degenerate one-hash LSH never surfaced these pairs, so the threshold
    alone appeared sufficient.)"""
    pairs = (
        cand.join(
            attrs.select(
                F.col("alias").alias("a"), F.col("norm").alias("norm_a"), F.col("shingles").alias("sh_a")
            ),
            "a",
        )
        .join(
            attrs.select(
                F.col("alias").alias("b"), F.col("norm").alias("norm_b"), F.col("shingles").alias("sh_b")
            ),
            "b",
        )
    )
    jaccard = F.size(F.array_intersect("sh_a", "sh_b")) / F.size(F.array_union("sh_a", "sh_b"))
    num_stem = lambda c: F.regexp_extract(c, r"^(?:entity|e)([0-9]+)$", 1)  # noqa: E731
    stem_a, stem_b = num_stem(F.col("norm_a")), num_stem(F.col("norm_b"))
    same_stem = (stem_a != "") & (stem_a == stem_b)
    diff_stem = (stem_a != "") & (stem_b != "") & (stem_a != stem_b)
    verified = pairs.filter(
        (F.col("norm_a") == F.col("norm_b"))
        | same_stem
        | ((jaccard >= jaccard_threshold) & ~diff_stem)
    )
    return verified.select("a", "b")


def candidate_pairs(
    aliases: DataFrame,
    alias_col: str = "alias",
    bands: int = DEFAULT_BANDS,
    rows_per_band: int = DEFAULT_ROWS_PER_BAND,
    jaccard_threshold: float = DEFAULT_JACCARD,
) -> DataFrame:
    """LSH-blocked, Jaccard-verified alias pairs (a < b)."""
    # persist inside _prepared_base: the banding union re-reads `base` per
    # band, and the blocking channels re-read it twice more — without it the
    # upstream alias derivation (often a whole linker run) re-executes per
    # branch
    base = _prepared_base(aliases, alias_col)
    keyed = _blocking_keyed(base, bands, rows_per_band)
    cand = (
        keyed.alias("l")
        .join(
            keyed.alias("r"),
            (F.col("l.bkey") == F.col("r.bkey")) & (F.col("l.alias") < F.col("r.alias")),
        )
        .select(F.col("l.alias").alias("a"), F.col("r.alias").alias("b"))
        .dropDuplicates(["a", "b"])
    )
    attrs = base.select("alias", "norm", "shingles")
    return _verify_pairs(cand, attrs, jaccard_threshold)


DRIVER_CC_THRESHOLD = 1_000_000  # edges; ~50 MB of pairs — trivial for union-find


def connected_components(
    edges: DataFrame,
    max_iterations: int = 20,
    src: str = "a",
    dst: str = "b",
    driver_threshold: int = DRIVER_CC_THRESHOLD,
) -> DataFrame:
    """Min-label propagation with path compression over undirected `edges`.

    Returns (alias, component) where component = min alias in the component.

    Physical strategy by size: an alias graph is orders smaller than the
    corpus that produced it (10^12 docs ⇒ ~10^6-10^8 distinct surfaces), so
    below `driver_threshold` edges the component computation collects the
    edge list and runs union-find on the driver (milliseconds, zero shuffles)
    — iterative joins there only pay ~diameter × per-action overhead.  Above
    the threshold the distributed path runs: one aggregation shuffle + one
    join per round, rounds ~ log(diameter), lineage truncated per round.
    Both paths implement identical min-label semantics (gated against the
    same recursive-closure SQL oracle).
    """
    spark = edges.sparkSession
    sym = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .unionByName(edges.select(F.col(dst).alias("u"), F.col(src).alias("v")))
        .distinct()
    )
    sym = sym.localCheckpoint(eager=True)
    # right-size the iteration frames: every round shuffles sym and labels,
    # and a component graph is usually orders smaller than the corpus that
    # produced it — inheriting the corpus-sized partition count makes each of
    # the ~diameter rounds pay empty-task overhead instead
    n_edges = sym.count()
    if n_edges <= driver_threshold:
        parent: dict = {}

        def find(x):
            while parent.setdefault(x, x) != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for row in sym.collect():
            u, v = row["u"], row["v"]
            ru, rv = find(u), find(v)
            if ru != rv:
                if rv < ru:
                    ru, rv = rv, ru
                parent[rv] = ru
        node_type = sym.schema["u"].dataType
        from pyspark.sql.types import StructField, StructType

        schema = StructType(
            [StructField("alias", node_type), StructField("component", node_type)]
        )
        rows = [(n, find(n)) for n in parent]
        return spark.createDataFrame(rows, schema)

    cap = int(spark.conf.get("spark.sql.shuffle.partitions", "64"))
    p = max(2, min(cap, n_edges // 50_000 + 1))
    sym = sym.coalesce(p).localCheckpoint(eager=True)
    labels = (
        sym.select(F.col("u").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
        .coalesce(p)
        .localCheckpoint(eager=True)
    )

    for _ in range(max_iterations):
        # neighbor-min: candidate label for u = min label among neighbors
        neigh = (
            sym.join(labels.withColumnRenamed("node", "v"), "v")
            .groupBy("u")
            .agg(F.min("label").alias("nlabel"))
            .withColumnRenamed("u", "node")
        )
        updated = (
            labels.join(neigh, "node", "left")
            .select("node", F.least("label", F.coalesce("nlabel", "label")).alias("label"))
        )
        # path compression: label := label(label)
        compressed = (
            updated.alias("x")
            .join(
                updated.select(
                    F.col("node").alias("label"), F.col("label").alias("label2")
                ).alias("y"),
                "label",
                "left",
            )
            .select(F.col("node"), F.least("label", F.coalesce("label2", "label")).alias("label"))
        )
        compressed = compressed.localCheckpoint(eager=True)
        changed = (
            compressed.alias("n")
            .join(labels.alias("o"), "node")
            .filter(F.col("n.label") != F.col("o.label"))
            .limit(1)
            .count()
        )
        labels = compressed
        if changed == 0:
            break

    return labels.select(F.col("node").alias("alias"), F.col("label").alias("component"))


def incremental_components(
    old_labels: DataFrame,
    delta_edges: DataFrame,
    src: str = "a",
    dst: str = "b",
    max_iterations: int = 20,
) -> DataFrame:
    """Dynamic CC maintenance WITH merges: given a previous run's
    (alias, component) table (component = min member, the
    :func:`connected_components` contract) and a DELTA edge batch, return
    the updated full (alias, component) table ≡ a full recompute over
    (old edges ∪ delta) — at O(|delta| + |touched components|) cost.

    This is the merge-applying half that :func:`incremental_canonicalize`
    deliberately defers ("the true merge is deferred to compaction"): run it
    on the component-contraction graph instead of recanonicalizing the
    corpus.  Correctness rests on min-label CC depending only on
    CONNECTIVITY: each delta endpoint CONTRACTS to its old component label
    (itself if unseen), CC runs on that tiny contracted graph, and the
    resulting merge map (old label → new min) joins back — a merged set's
    new min over labels IS the min over all member aliases, because every
    old label already was its component's min.

    Scale shape: one broadcastable label-lookup join per endpoint, CC over
    |delta|-bounded contracted edges (driver union-find under the
    threshold), one merge-map join back over the store (labels not in the
    map pass through), plus the new-node append.  The full corpus edge set
    is never touched."""
    lab = old_labels.select(F.col("alias"), F.col("component"))
    d = (
        delta_edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .filter(F.col("u").isNotNull() & F.col("v").isNotNull())
        .distinct()
    )

    def to_rep(side: str):
        # distinct BEFORE the label join: a hub endpoint repeated across k
        # delta edges would otherwise yield k identical (alias, rep) rows
        # and fan the du joins out quadratically
        return (
            d.select(F.col(side).alias("alias"))
            .distinct()
            .join(lab, "alias", "left")
            .select(
                F.col("alias"),
                F.coalesce("component", "alias").alias(f"rep_{side}"),
            )
        )

    du = d.join(to_rep("u").withColumnRenamed("alias", "u"), "u").join(
        to_rep("v").withColumnRenamed("alias", "v"), "v"
    )
    contracted = (
        du.select(F.col("rep_u").alias("a"), F.col("rep_v").alias("b"))
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )
    merge_map = connected_components(
        contracted, max_iterations=max_iterations
    ).select(F.col("alias").alias("rep"), F.col("component").alias("new_comp"))
    updated_old = lab.join(
        merge_map.withColumnRenamed("rep", "component"), "component", "left"
    ).select("alias", F.coalesce("new_comp", "component").alias("component"))
    endpoints = d.select(F.col("u").alias("alias")).unionByName(
        d.select(F.col("v").alias("alias"))
    ).distinct()
    new_nodes = (
        endpoints.join(lab.select("alias"), "alias", "left_anti")
        .join(merge_map.withColumnRenamed("rep", "alias"), "alias", "left")
        .select("alias", F.coalesce("new_comp", "alias").alias("component"))
    )
    return updated_old.unionByName(new_nodes)


def canonicalize_aliases(
    aliases: DataFrame,
    alias_col: str = "alias",
    bands: int = DEFAULT_BANDS,
    rows_per_band: int = DEFAULT_ROWS_PER_BAND,
    jaccard_threshold: float = DEFAULT_JACCARD,
) -> DataFrame:
    """Full E6: (alias, entity_id) where entity_id is the component's smallest
    alias.  Singleton aliases (no verified pair) map to themselves."""
    distinct_aliases = (
        aliases.select(F.col(alias_col).alias("alias"))
        .filter(F.col("alias").isNotNull())
        .distinct()
    )
    edges = candidate_pairs(
        distinct_aliases, "alias", bands=bands, rows_per_band=rows_per_band,
        jaccard_threshold=jaccard_threshold,
    )
    comp = connected_components(edges)
    return (
        distinct_aliases.join(comp, "alias", "left")
        .select("alias", F.coalesce("component", "alias").alias("entity_id"))
    )


def incremental_canonicalize(
    new_aliases: DataFrame,
    canon_store: DataFrame,
    alias_col: str = "alias",
    bands: int = DEFAULT_BANDS,
    rows_per_band: int = DEFAULT_ROWS_PER_BAND,
    jaccard_threshold: float = DEFAULT_JACCARD,
) -> DataFrame:
    """Delta entity resolution: assign entity ids to NEW alias surfaces
    against an existing canonical store WITHOUT recanonicalizing the corpus —
    the production shape of E6 at 100 TB (full re-runs are compaction's job,
    same batch/compaction split as resume and streaming near-dup).

    ``canon_store`` is the existing (alias, entity_id) table.  Returns the
    DELTA rows only — (alias, entity_id) for aliases not already in the
    store — the append-shape a persisted store needs.

    Assignment:
      * delta aliases are blocked+verified against the STORE aliases (the
        same LSH ∪ norm ∪ stem channels and Jaccard/stem-veto verification
        as the batch path) and against EACH OTHER;
      * a delta-delta component that matches any store alias ADOPTS the
        smallest matched entity_id; an unmatched component mints its
        smallest member as the new entity_id (the batch election rule).

    Contract: the delta NEVER merges two existing store entities — a delta
    alias bridging entities A and B adopts min(A, B) for itself and leaves
    the store untouched; the true merge is deferred to the cold
    recanonicalize compaction (test-pinned).  This keeps the incremental
    step append-only and idempotent.

    Scale shape: delta-vs-store candidates come from the (bkey)-equi-join of
    the delta's skinny blocking rows against the store's — at 10^12 aliases
    the store's (alias, bkey) rows are the PERSISTED index (bucket by bkey
    on disk; this function recomputes them from the alias column for
    self-containment); shingle attributes re-join candidate-sized.  The
    delta-delta closure runs on the delta only."""
    store = canon_store.select(
        F.col("alias").alias("alias"), F.col("entity_id").alias("entity_id")
    )
    delta_raw = (
        new_aliases.select(F.col(alias_col).alias("alias"))
        .filter(F.col("alias").isNotNull())
        .distinct()
        .join(store.select("alias"), "alias", "left_anti")
    )
    base_d = _prepared_base(delta_raw, "alias")
    base_s = _prepared_base(store.select("alias"), "alias")
    keyed_d = _blocking_keyed(base_d, bands, rows_per_band)
    keyed_s = _blocking_keyed(base_s, bands, rows_per_band)

    # delta-vs-delta pairs (a < b) — the batch shape over the delta only
    cand_dd = (
        keyed_d.alias("l")
        .join(
            keyed_d.alias("r"),
            (F.col("l.bkey") == F.col("r.bkey")) & (F.col("l.alias") < F.col("r.alias")),
        )
        .select(F.col("l.alias").alias("a"), F.col("r.alias").alias("b"))
        .dropDuplicates(["a", "b"])
    )
    attrs_d = base_d.select("alias", "norm", "shingles")
    verified_dd = _verify_pairs(cand_dd, attrs_d, jaccard_threshold)

    # delta-vs-store pairs: asymmetric — a is always the delta alias
    cand_ds = (
        keyed_d.alias("l")
        .join(keyed_s.alias("r"), F.col("l.bkey") == F.col("r.bkey"))
        .select(F.col("l.alias").alias("a"), F.col("r.alias").alias("b"))
        .dropDuplicates(["a", "b"])
    )
    attrs_all = attrs_d.unionByName(base_s.select("alias", "norm", "shingles"))
    verified_ds = _verify_pairs(cand_ds, attrs_all, jaccard_threshold)

    # per-delta-alias adopted entity: min entity_id over matched store rows
    adopted = (
        verified_ds.join(store.withColumnRenamed("alias", "b"), "b")
        .groupBy(F.col("a").alias("alias"))
        .agg(F.min("entity_id").alias("adopt"))
    )
    comp = connected_components(verified_dd).select(
        F.col("alias"), F.col("component").alias("grp")
    )
    withg = (
        base_d.select("alias")
        .join(comp, "alias", "left")
        .withColumn("grp", F.coalesce(F.col("grp"), F.col("alias")))
        .join(adopted, "alias", "left")
    )
    # group-level adoption: smallest adopted entity across the component;
    # otherwise the component label (= its smallest member, the batch rule)
    grp_ent = withg.groupBy("grp").agg(F.min("adopt").alias("grp_adopt"))
    out = withg.join(grp_ent, "grp").select(
        "alias", F.coalesce("grp_adopt", "grp").alias("entity_id")
    )
    # materialize BEFORE dropping the base caches: the caller's first action
    # runs after we return, and an unpersisted lazy plan would re-execute
    # the store scan and delta derivation once per blocking/verify branch
    out = out.localCheckpoint()
    base_d.unpersist()
    base_s.unpersist()
    return out


_ACRO_RE = r"((?:[A-Z][A-Za-z0-9]* )+)\(([A-Z]{2,6})\)"


def mine_acronym_aliases(
    chunks: DataFrame,
    text_col: str = "text_chunk",
) -> DataFrame:
    """(long_form, acronym, n_mentions) — parenthetical-definition alias
    pairs ("World Health Organization (WHO)"), the Schwartz-Hearst pattern
    reduced to its high-precision core.  Feeds the E6 canonicalization
    stage as an extra alias-pair source (an acronym and its expansion are
    by construction the same entity).

    Contract (unit-pinned, oracle-mirrored):
    * candidate = a run of capitalized tokens immediately followed by a
      parenthesized 2-6 letter uppercase acronym;
    * the long form is the LAST len(acronym) tokens of the run (leading
      sentence words like "The" self-trim), and each token's initial must
      match the acronym position-for-position — mismatches and too-short
      runs emit nothing (no fuzzy back-off);
    * n_mentions counts occurrences corpus-wide.

    100 TB shape: regex + array expressions are one narrow JVM projection;
    the only exchange carries (long_form, acronym) aggregate rows — alias
    cardinality, not mention cardinality (map-side combine)."""
    text = F.col(text_col)
    longs = F.regexp_extract_all(text, F.lit(_ACRO_RE), F.lit(1))
    acrs = F.regexp_extract_all(text, F.lit(_ACRO_RE), F.lit(2))
    pairs = F.zip_with(
        longs,
        acrs,
        lambda l, a: F.struct(
            F.split(F.trim(l), " ").alias("words"), a.alias("acr")
        ),
    )
    m = chunks.select(F.explode(pairs).alias("m")).select(
        F.col("m.words").alias("words"), F.col("m.acr").alias("acr")
    )
    k = F.length("acr")
    tail = F.slice(F.col("words"), F.size("words") - k + 1, k)
    initials = F.array_join(
        F.transform(tail, lambda w: F.substring(w, 1, 1)), ""
    )
    return (
        m.where(F.size("words") >= k)
        .select(
            F.array_join(tail, " ").alias("long_form"),
            F.col("acr").alias("acronym"),
            initials.alias("initials"),
        )
        .where(F.col("initials") == F.col("acronym"))
        .groupBy("long_form", "acronym")
        .agg(F.count(F.lit(1)).alias("n_mentions"))
    )


def attribute_merge_candidates(
    triples: DataFrame,
    min_shared: int = 2,
    max_df: int = 1000,
    subj_col: str = "subj",
    pred_col: str = "pred",
    obj_col: str = "obj",
) -> DataFrame:
    """Collective entity resolution over the KG itself: candidate pairs of
    subjects that share ≥ ``min_shared`` DISTINCT (pred, obj) facts — the
    attribute-evidence complement to the surface-form clustering above (two
    spellings the alias blocker never relates still merge when they work for
    the same employer, sit in the same city and were founded the same year;
    Bhattacharya & Getoor's collective-ER signal re-expressed relationally).
    Emits CANDIDATES with evidence counts; keeper election / merge policy
    stays downstream, same split as the blocking→verify stages above.

    Skew/noise guard: facts whose (pred, obj) document frequency exceeds
    ``max_df`` are excluded from matching ENTIRELY (blocking key and counts
    both) — a fact shared by half the KG ("based_in Berlin") is the
    stop-word of ER evidence and is also exactly the key whose self-join
    fans out quadratically.  All reported counts/sizes are over these
    discriminative facts only (documented contract).

    Output: (a, b, n_shared, n_facts_a, n_facts_b, jaccard_i) with a < b and
    ``jaccard_i = 1e6·|∩| div |∪|`` over the discriminative fact sets.

    100 TB shape: one distinct on the triple, one map-side-combinable df
    count keyed on (pred, obj), then the pair self-join carries (subj, pred,
    obj) only with per-key fan-out bounded by max_df² — the cap is the skew
    salting here, chosen not measured.  Sizes re-join on the subject key;
    nothing collects.
    """
    # the generic key-overlap wedge (distinct → fan-out cap → a<b join →
    # sizes → integer jaccard) lives in linkgraph._overlap_pairs; here the
    # shared key is the (pred, obj) fact and the item is the subject.
    # Imported in-function: canonicalize ← linkgraph would otherwise risk a
    # cycle through linkgraph's urlnorm imports.
    from aiwhispr_spark.operators.linkgraph import _overlap_pairs

    rel = triples.select(
        F.struct(
            F.col(pred_col).alias("pred"), F.col(obj_col).alias("obj")
        ).alias("key"),
        F.col(subj_col).alias("item"),
    )
    out = _overlap_pairs(rel, max_fanout=max_df)
    return out.filter(F.col("n_common") >= min_shared).select(
        "a",
        "b",
        F.col("n_common").alias("n_shared"),
        F.col("deg_a").alias("n_facts_a"),
        F.col("deg_b").alias("n_facts_b"),
        "jaccard_i",
    )
