"""Deduplication suite for large-scale training-data pipelines.

Five strategies, all shuffle-disciplined for 100 TB inputs:

* exact            — hash-groupBy on content (or a content digest for wide
                     text: shuffle moves 8-byte hashes, not documents)
* minhash_lsh      — shingle → minhash → band → bucket-join (near-dup text);
                     signatures are JVM-side xxhash64 folds, no Python
* simhash          — 64-bit simhash via per-token md5-derived bits, hamming
                     band blocking
* ngram_jaccard    — token n-gram Jaccard verify over length-banded pairs
* embedding_cosine — near-dup by cosine over an embedding column

Each returns a decision DataFrame (keep/drop or pair lists) rather than
mutating inputs, so callers compose them with anti-joins.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .canonicalize import connected_components
from ..functions.udfs import bound, cosine_cols_expr


def exact_duplicates(
    df: DataFrame, content_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(id, keep_id, group_size): groups of byte-identical content; keeper =
    min id.  Shuffles (digest, id) pairs only — the 128-bit md5 digest stands
    in for arbitrarily large documents."""
    digested = df.select(
        F.col(id_col).alias("id"), F.md5(F.col(content_col).cast("string")).alias("digest")
    )
    w = Window.partitionBy("digest")
    return (
        digested.withColumn("keep_id", F.min("id").over(w))
        .withColumn("group_size", F.count(F.lit(1)).over(w))
        .select("id", "keep_id", "group_size")
    )


def _token_ngrams(col: Column, n: int) -> Column:
    """Token n-grams of a whitespace-tokenized string, JVM-side.

    The split() result MUST be bound to a lambda variable (``bound``) before
    the per-element inner transform references it, or split() re-runs per
    token — O(tokens²) per document (see ``functions.udfs.bound``)."""
    toks = F.split(F.trim(col), r"\s+")
    if n == 1:
        return F.array_distinct(toks)
    return bound(
        toks,
        lambda t: F.array_distinct(
            F.filter(
                F.transform(
                    t,
                    lambda _, i: F.when(
                        i + n <= F.size(t), F.array_join(F.slice(t, i + 1, n), " ")
                    ),
                ),
                lambda x: x.isNotNull(),
            )
        ),
    )


def _seeded_xxhash(seed: int):
    """Closure factory for a seeded shingle hash.  MUST be a factory: a
    2-parameter lambda passed to F.transform binds its second argument to the
    array ELEMENT INDEX, so `lambda s, i=i: xxhash64(s, lit(i))` silently makes
    every "seed" the element index — all minhash columns become the same
    expression and LSH degenerates to a single hash function (CLAUDE.md arity
    note)."""
    return lambda s: F.xxhash64(s, F.lit(seed))


def minhash_signature(sh_col: Column, n_hashes: int, seeded_hash=_seeded_xxhash) -> list[Column]:
    """minhash_i = min over shingles of seeded_hash(i)(shingle), i in
    [0, n_hashes).  Shared by the dedup and alias-canonicalization paths and
    pinned by a seed-sensitivity test (different seeds MUST give different
    signature columns on a fixed shingle set)."""
    return [
        F.array_min(F.transform(sh_col, seeded_hash(i))).alias(f"mh{i}")
        for i in range(n_hashes)
    ]


def _band_candidates(sig: DataFrame, band_keys: Column) -> DataFrame:
    """(a, b) candidate pairs from a banded self-join.

    `band_keys` is an ARRAY of per-band bucket keys; posexplode turns it into
    (band, bhash) rows in ONE narrow stage — no bands-way union (a K-branch
    union multiplies map-side partitions by K, CLAUDE.md perf trap) and, since
    only (id, band, bhash) rows are projected, the self-join shuffle moves
    fixed-width keys — never the shingle arrays (which would ride the exchange
    ×bands at corpus scale)."""
    banded = sig.select("id", F.posexplode(band_keys).alias("band", "bhash"))
    return (
        banded.alias("l")
        .join(
            banded.alias("r"),
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.bhash") == F.col("r.bhash"))
            & (F.col("l.id") < F.col("r.id")),
        )
        .select(F.col("l.id").alias("a"), F.col("r.id").alias("b"))
        .dropDuplicates(["a", "b"])
    )


def _jaccard_verify(
    cand: DataFrame, shingles: DataFrame, jaccard_threshold: float
) -> DataFrame:
    """Re-attach true shingle sets to the (candidate-sized, not corpus×bands-
    sized) pair set and keep pairs with Jaccard ≥ threshold.  The two id-keyed
    joins shuffle each doc's shingles at most twice — independent of the band
    count."""
    pairs = (
        cand.join(shingles.select(F.col("id").alias("a"), F.col("sh").alias("sh_a")), "a")
        .join(shingles.select(F.col("id").alias("b"), F.col("sh").alias("sh_b")), "b")
    )
    jac = (
        F.size(F.array_intersect("sh_a", "sh_b"))
        / F.size(F.array_union("sh_a", "sh_b"))
    ).alias("jaccard")
    return pairs.select("a", "b", jac).filter(F.col("jaccard") >= jaccard_threshold)


def minhash_lsh_pairs(
    df: DataFrame,
    content_col: str = "text",
    id_col: str = "doc_id",
    shingle_n: int = 3,
    bands: int = 16,
    rows_per_band: int = 4,
    jaccard_threshold: float = 0.7,
) -> DataFrame:
    """Near-duplicate pairs (a < b, jaccard) via MinHash banding.

    All signature math is expression-level: minhash_i = min(xxhash64(shingle,
    seed=i)); band key = xxhash64(row of minhashes).  The band-bucket
    self-join shuffles only (id, band, bhash) rows — candidates, never the
    corpus cross-product and never the shingle payloads.  Final Jaccard is
    verified on true shingle sets re-joined by id (candidate-sized)."""
    base = df.select(
        F.col(id_col).alias("id"), _token_ngrams(F.col(content_col), shingle_n).alias("sh")
    ).filter(F.size("sh") > 0)

    n_hashes = bands * rows_per_band
    sig = base.select("id", *minhash_signature(F.col("sh"), n_hashes))
    band_keys = F.array(
        *[
            F.xxhash64(*[F.col(f"mh{b * rows_per_band + r}") for r in range(rows_per_band)])
            for b in range(bands)
        ]
    )
    cand = _band_candidates(sig, band_keys)
    return _jaccard_verify(cand, base, jaccard_threshold)


def _md5_hash60(col: Column, seed: int) -> Column:
    """Seeded 60-bit hash of a string: first 15 hex chars of md5(s + ':seed').
    md5 exists identically in Spark and DuckDB, so operators built on this
    hash admit exact cross-engine oracles (unlike xxhash64)."""
    return F.conv(
        F.substring(F.md5(F.concat(col, F.lit(f":{seed}"))), 1, 15), 16, 10
    ).cast("long")


def minhash_lsh_pairs_md5(
    df: DataFrame,
    content_col: str = "text",
    id_col: str = "doc_id",
    shingle_n: int = 3,
    bands: int = 8,
    rows_per_band: int = 2,
    jaccard_threshold: float = 0.5,
) -> DataFrame:
    """Oracle-checkable variant of :func:`minhash_lsh_pairs`: identical banding
    dataflow, but every hash is md5-derived (``_md5_hash60``) so DuckDB can
    reproduce each signature, band key, and surviving pair bit-for-bit.  The
    scale path stays on xxhash64 (one JVM hash vs four md5 rounds per probe);
    this path is the correctness gate for it."""
    base = df.select(
        F.col(id_col).alias("id"), _token_ngrams(F.col(content_col), shingle_n).alias("sh")
    ).filter(F.size("sh") > 0)

    n_hashes = bands * rows_per_band
    sig = base.select(
        "id",
        *minhash_signature(
            F.col("sh"), n_hashes, lambda i: (lambda s: _md5_hash60(s, i))
        ),
    )
    band_keys = F.array(
        *[
            F.md5(
                F.concat_ws(
                    "|",
                    *[
                        F.col(f"mh{b * rows_per_band + r}").cast("string")
                        for r in range(rows_per_band)
                    ],
                )
            )
            for b in range(bands)
        ]
    )
    cand = _band_candidates(sig, band_keys)
    return _jaccard_verify(cand, base, jaccard_threshold)


def minhash_dedup_groups(
    df: DataFrame, content_col: str = "text", id_col: str = "doc_id", **kw
) -> DataFrame:
    """(id, keep_id): connected components over near-dup pairs; keeper = min id."""
    pairs = minhash_lsh_pairs(df, content_col, id_col, **kw)
    comp = connected_components(pairs.select("a", "b"))
    ids = df.select(F.col(id_col).alias("id"))
    return ids.join(
        comp.withColumnRenamed("alias", "id").withColumnRenamed("component", "keep_id"),
        "id",
        "left",
    ).select("id", F.coalesce("keep_id", "id").alias("keep_id"))


SIMHASH_BITS = 60  # md5's first 15 hex chars give 60 clean bits


def simhash64(col: Column) -> Column:
    """60-bit SimHash of a whitespace-tokenized string column, fully JVM-side.

    Per token: md5 → first 15 hex chars → 60-bit long; per bit position:
    majority vote via sum of ±1.  The bit loop unrolls in Python (Spark's
    shiftright takes a literal shift), producing one flat codegen'd
    expression — no UDF, no shuffle.
    """
    toks = F.array_distinct(F.split(F.trim(col), r"\s+"))
    tok_hash = F.transform(toks, lambda t: F.conv(F.substring(F.md5(t), 1, 15), 16, 10).cast("long"))
    def vote_fn(i: int):
        # Spark requires exactly-2-ary merge lambdas; bind i via factory
        return lambda acc, h: acc + F.when(
            F.shiftright(h, i).bitwiseAND(F.lit(1)) == 1, 1
        ).otherwise(-1)

    def fold_bits(th: Column) -> Column:
        val = F.lit(0).cast("long")
        for i in range(SIMHASH_BITS):
            vote = F.aggregate(th, F.lit(0), vote_fn(i))
            val = val + F.when(vote > 0, F.lit(1 << i).cast("long")).otherwise(
                F.lit(0).cast("long")
            )
        return val

    # tok_hash MUST be bound once: each of the 60 per-bit aggregates
    # re-evaluates its argument, so the unbound form re-ran md5 over every
    # token 60× (see functions.udfs.bound)
    return bound(tok_hash, fold_bits)


def simhash_pairs(
    df: DataFrame,
    content_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 3,
) -> DataFrame:
    """Near-dup pairs by SimHash: block on 4 × 15-bit bands (any pair within
    hamming ≤ 3 of 60 bits shares at least one exact band — pigeonhole),
    verify true hamming distance."""
    sh = df.select(F.col(id_col).alias("id"), simhash64(F.col(content_col)).alias("simhash"))
    bands = F.array(
        *[
            F.shiftright(F.col("simhash"), 15 * i).bitwiseAND(F.lit(0x7FFF))
            for i in range(4)
        ]
    )
    # posexplode, not a 4-way union: one narrow stage, no map-side fan-out.
    # The 8-byte fingerprint rides the shuffle (needed for the hamming verify);
    # unlike shingle arrays it is fixed-width, so the exchange stays skinny.
    stacked = sh.select("id", "simhash", F.posexplode(bands).alias("band", "bval"))
    pairs = (
        stacked.alias("l")
        .join(
            stacked.alias("r"),
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.bval") == F.col("r.bval"))
            & (F.col("l.id") < F.col("r.id")),
        )
        .select(
            F.col("l.id").alias("a"),
            F.col("r.id").alias("b"),
            F.col("l.simhash").alias("sh_a"),
            F.col("r.simhash").alias("sh_b"),
        )
        .dropDuplicates(["a", "b"])
    )
    hamming = F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b"))).alias("hamming")
    return pairs.select("a", "b", hamming).filter(F.col("hamming") <= max_hamming)


def ngram_jaccard_pairs(
    df: DataFrame,
    content_col: str = "text",
    id_col: str = "doc_id",
    n: int = 2,
    threshold: float = 0.8,
    length_band_pct: float = 0.2,
) -> DataFrame:
    """Exact n-gram Jaccard over LENGTH-BANDED pairs: docs whose token counts
    differ by more than `length_band_pct` cannot reach the threshold, so the
    self-join is keyed on a coarse length bucket instead of being a cross
    product.  (At 100 TB this is the verify stage after MinHash blocking; the
    standalone form here is for modest candidate sets.)"""
    base = df.select(
        F.col(id_col).alias("id"),
        _token_ngrams(F.col(content_col), n).alias("grams"),
        F.size(F.split(F.trim(F.col(content_col)), r"\s+")).alias("len"),
    ).filter(F.size("grams") > 0)
    bucket_width = F.greatest(F.lit(1), (F.col("len") * length_band_pct).cast("int"))
    base = base.withColumn("bucket", (F.col("len") / bucket_width).cast("long"))
    # a qualifying pair's buckets differ by at most 1 → join on bucket and bucket+1
    cands = base.select("id", "grams", "bucket").unionByName(
        base.select("id", "grams", (F.col("bucket") + 1).alias("bucket"))
    )
    pairs = (
        base.alias("l")
        .join(
            cands.alias("r"),
            (F.col("l.bucket") == F.col("r.bucket")) & (F.col("l.id") < F.col("r.id")),
        )
        .select(
            F.col("l.id").alias("a"),
            F.col("r.id").alias("b"),
            F.col("l.grams").alias("g_a"),
            F.col("r.grams").alias("g_b"),
        )
        .dropDuplicates(["a", "b"])
    )
    jac = (
        F.size(F.array_intersect("g_a", "g_b")) / F.size(F.array_union("g_a", "g_b"))
    ).alias("jaccard")
    return pairs.select("a", "b", jac).filter(F.col("jaccard") >= threshold)


def containment_pairs(
    df: DataFrame,
    content_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    threshold: float = 0.9,
    max_shingle_df: int = 500,
    scale: int = 1_000_000,
) -> DataFrame:
    """ASYMMETRIC shingle containment (Broder: containment, not resemblance):
    ``C(a→b) = |S_a ∩ S_b| / |S_a|`` — detects syndicated copies, quoted
    articles wrapped in boilerplate, and template supersets, where Jaccard
    stays low because the container is much larger than the contained doc.

    Output: (contained, container, n_contained, n_common, containment_i)
    — one row per DIRECTION with ``containment_i = ⌊scale·common/|S_a|⌋ ≥
    ⌊scale·threshold⌋`` (exact integer math; both directions of an unordered
    pair can qualify when the docs are near-identical).

    Blocking: the df cap counts per shingle STRING (one linear string-keyed
    aggregate — a 64-bit hash collision must never pool two shingles'
    frequencies); the QUADRATIC candidate self-join then runs on the 8-byte
    xxhash64 key (fixed-width shuffle rows where it matters).  Shingles with
    document frequency > ``max_shingle_df`` (corpus boilerplate) are
    dropped from CANDIDATE GENERATION only — the verify recomputes the
    intersection on the FULL shingle sets, so the cap costs recall only for
    pairs sharing nothing but ultra-common shingles.  Fanout per surviving
    shingle is bounded by the cap (≤ df² pairs)."""
    thr_i = int(round(scale * threshold))
    base = df.select(
        F.col(id_col).alias("id"),
        _token_ngrams(F.col(content_col), n).alias("sh"),
    ).filter(F.size("sh") > 0)
    post = base.select("id", F.explode("sh").alias("s"))
    # sh is distinct per doc already (array_distinct in _token_ngrams).
    # The df cap counts per shingle STRING (the docstring/oracle semantics —
    # a 64-bit hash collision must not pool two shingles' frequencies); only
    # the quadratic candidate join downstream switches to the 8-byte hash.
    rare = post.groupBy("s").agg(F.count(F.lit(1)).alias("df")).filter(
        F.col("df") <= max_shingle_df
    )
    p = post.join(rare.select("s"), "s").select("id", F.xxhash64("s").alias("fp"))
    cand = (
        p.alias("l")
        .join(p.alias("r"), (F.col("l.fp") == F.col("r.fp")) & (F.col("l.id") < F.col("r.id")))
        .select(F.col("l.id").alias("a"), F.col("r.id").alias("b"))
        .distinct()
    )
    v = (
        cand.join(base.select(F.col("id").alias("a"), F.col("sh").alias("sh_a")), "a")
        .join(base.select(F.col("id").alias("b"), F.col("sh").alias("sh_b")), "b")
        .select(
            "a",
            "b",
            F.size("sh_a").cast("long").alias("n_a"),
            F.size("sh_b").cast("long").alias("n_b"),
            F.size(F.array_intersect("sh_a", "sh_b")).cast("long").alias("n_common"),
        )
    )
    fwd = v.select(
        F.col("a").alias("contained"),
        F.col("b").alias("container"),
        F.col("n_a").alias("n_contained"),
        "n_common",
        F.expr(f"CAST(({int(scale)} * n_common) div n_a AS BIGINT)").alias(
            "containment_i"
        ),
    )
    bwd = v.select(
        F.col("b").alias("contained"),
        F.col("a").alias("container"),
        F.col("n_b").alias("n_contained"),
        "n_common",
        F.expr(f"CAST(({int(scale)} * n_common) div n_b AS BIGINT)").alias(
            "containment_i"
        ),
    )
    return fwd.unionByName(bwd).filter(F.col("containment_i") >= thr_i)


def embedding_near_dup_pairs(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    threshold: float = 0.95,
    n_planes: int = 8,
    dim: int | None = None,
) -> DataFrame:
    """Near-dup pairs by embedding cosine ≥ threshold.  Blocking: random-
    hyperplane (sign-LSH) bucket — vectors agreeing on all `n_planes` signs
    meet; high-cosine pairs agree w.h.p.  Verify with exact cosine.  For exact
    small-scale semantics set n_planes=0 (single bucket → full self-join).

    Pass `dim` (the embedding dimensionality) explicitly — it is a property of
    the table's schema contract, and reading it from the data would run a
    driver-side action before the plan is even returned."""
    base = df.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v"))
    if n_planes > 0 and dim is None:
        # last-resort fallback for ad-hoc callers; hot paths pass dim
        row = base.select("v").first()
        if row is None or row["v"] is None:
            # empty (or all-null) input: no planes to derive — degrade to the
            # single-bucket path, whose self-join is trivially empty
            n_planes = 0
        else:
            dim = len(row["v"])
    if n_planes > 0:
        import random

        rng = random.Random(42)
        planes = [[rng.gauss(0, 1) for _ in range(dim)] for _ in range(n_planes)]
        sig = F.concat(
            *[
                F.when(
                    F.aggregate(
                        F.zip_with(
                            F.col("v").cast("array<double>"),
                            F.lit(p).cast("array<double>"),
                            lambda x, y: x * y,
                        ),
                        F.lit(0.0),
                        lambda a, x: a + x,
                    )
                    >= 0,
                    F.lit("1"),
                ).otherwise(F.lit("0"))
                for p in planes
            ]
        )
        base = base.withColumn("bucket", sig)
    else:
        base = base.withColumn("bucket", F.lit("all"))
    pairs = (
        base.alias("l")
        .join(
            base.alias("r"),
            (F.col("l.bucket") == F.col("r.bucket")) & (F.col("l.id") < F.col("r.id")),
        )
        .select(
            F.col("l.id").alias("a"),
            F.col("r.id").alias("b"),
            cosine_cols_expr(F.col("l.v"), F.col("r.v")).alias("cos"),
        )
    )
    return pairs.filter(F.col("cos") >= threshold)


# --- incremental (delta-vs-store) dedup ----------------------------------------------


def incremental_exact_dedup(
    new_docs: DataFrame,
    digest_store: DataFrame | None,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> tuple[DataFrame, DataFrame]:
    """Dedup a DELTA against an accumulated digest store — the shape exact
    dedup takes at 10^12 docs, where re-scanning the historical corpus per
    ingest batch is not an option (same O(delta) discipline as the KG
    pipeline's manifest resume).

    `digest_store` is the persisted (digest, keep_id) table from previous
    batches (None for the first batch).  Returns ``(keepers, updated_store)``:

    * keepers — the delta rows that survive: NOT a duplicate of any stored
      digest, and the min-id representative of any intra-delta group;
    * updated_store — store ∪ the keepers' digests, to persist for the next
      batch (append only the new rows in practice).

    Invariant (test-pinned): folding a corpus through any batch split yields
    EXACTLY the keepers of a full-corpus `exact_duplicates` run with min-id
    election, because the first batch containing a digest elects the global
    min id for it (ids are ingest-ordered across batches; for unordered ids
    the election is first-arrival — document which contract you need).

    Scale shape: delta shuffles once on digest (intra-delta election); the
    store join is digest-keyed (broadcast while the store is small, SMJ on
    the bucketed store table once it is not); the historical CORPUS is never
    read."""
    hashed = new_docs.select(
        F.col(id_col).alias("id"), F.md5(F.col(text_col)).alias("digest")
    )
    w = Window.partitionBy("digest")
    intra = (
        hashed.withColumn("keep_id", F.min("id").over(w))
        .filter(F.col("id") == F.col("keep_id"))
        .select("digest", "keep_id")
    )
    if digest_store is not None:
        fresh = intra.join(digest_store.select("digest"), "digest", "left_anti")
    else:
        fresh = intra
    keepers = new_docs.join(
        fresh.select(F.col("keep_id").alias(id_col)), id_col, "left_semi"
    )
    updated_store = (
        digest_store.unionByName(fresh) if digest_store is not None else fresh
    )
    return keepers, updated_store


def minhash_index(
    df: DataFrame,
    content_col: str = "text",
    id_col: str = "doc_id",
    shingle_n: int = 3,
    bands: int = 8,
    rows_per_band: int = 2,
    hash_family: str = "xxhash64",
) -> tuple[DataFrame, DataFrame]:
    """Build the persistable LSH index of a corpus batch: ``(band_store,
    sig_store)`` with ``band_store = (id, band, bhash)`` and ``sig_store =
    (id, sig array<long>)``.  Two normalized tables on purpose — band rows
    are bands× per doc while the signature is stored once; at 10^12 docs the
    band store is the thing you bucket by (band, bhash) on disk.

    ``hash_family``: ``xxhash64`` (scale path, one JVM hash per probe) or
    ``md5`` (oracle path — every signature and band key reproducible in
    DuckDB, the :func:`minhash_lsh_pairs_md5` twin discipline)."""
    if hash_family == "xxhash64":
        seeded, bhash_of = _seeded_xxhash, lambda cols: F.xxhash64(*cols)
    elif hash_family == "md5":
        seeded = lambda i: (lambda s: _md5_hash60(s, i))  # noqa: E731
        bhash_of = lambda cols: F.md5(  # noqa: E731
            F.concat_ws("|", *[c.cast("string") for c in cols])
        )
    else:
        raise ValueError(f"unknown hash_family {hash_family!r}")

    base = df.select(
        F.col(id_col).alias("id"),
        _token_ngrams(F.col(content_col), shingle_n).alias("sh"),
    ).filter(F.size("sh") > 0)
    n_hashes = bands * rows_per_band
    sig_cols = minhash_signature(F.col("sh"), n_hashes, seeded)
    sig = base.select("id", *sig_cols)
    band_keys = F.array(
        *[
            bhash_of([F.col(f"mh{b * rows_per_band + r}") for r in range(rows_per_band)])
            for b in range(bands)
        ]
    )
    band_store = sig.select("id", F.posexplode(band_keys).alias("band", "bhash"))
    sig_store = sig.select(
        "id", F.array(*[F.col(f"mh{i}") for i in range(n_hashes)]).alias("sig")
    )
    return band_store, sig_store


def incremental_minhash_pairs(
    new_docs: DataFrame,
    band_store: DataFrame | None,
    sig_store: DataFrame | None,
    content_col: str = "text",
    id_col: str = "doc_id",
    shingle_n: int = 3,
    bands: int = 8,
    rows_per_band: int = 2,
    min_matches: int = 8,
    hash_family: str = "xxhash64",
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Near-dup detection for a DELTA against an accumulated LSH index — the
    shape MinHash dedup takes at crawl scale, where each day's batch must
    not re-shingle the historical corpus (the near-dup twin of
    :func:`incremental_exact_dedup`).

    Returns ``(new_pairs, band_store', sig_store')``.  ``new_pairs`` =
    ``(a, b, n_match_i)`` with a < b, every pair involving ≥1 delta doc
    (delta×store band hits ∪ delta×delta), verified by SIGNATURE AGREEMENT:
    ``n_match_i`` = number of equal minhash components (estimated Jaccard =
    n_match/n_hashes) ≥ ``min_matches``.  Signature verification — not raw
    shingle Jaccard — is deliberate: the index stores fixed-width signatures,
    never the historical corpus text, so verification needs no re-read of
    old documents (the property that makes the operator incremental at all).

    Scale shape: the delta's band rows join the (band, bhash)-bucketed store
    — candidate-sized output, fixed-width keys on the exchange; signatures
    re-join candidate-sized by id.  Store growth is append-only."""
    pairs, delta_bands, delta_sigs = incremental_minhash_step(
        new_docs,
        band_store,
        sig_store,
        content_col,
        id_col,
        shingle_n,
        bands,
        rows_per_band,
        min_matches,
        hash_family,
    )
    if band_store is None:
        return pairs, delta_bands, delta_sigs
    return (
        pairs,
        band_store.unionByName(delta_bands),
        sig_store.unionByName(delta_sigs),
    )


def incremental_minhash_step(
    new_docs: DataFrame,
    band_store: DataFrame | None,
    sig_store: DataFrame | None,
    content_col: str = "text",
    id_col: str = "doc_id",
    shingle_n: int = 3,
    bands: int = 8,
    rows_per_band: int = 2,
    min_matches: int = 8,
    hash_family: str = "xxhash64",
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """One delta step of :func:`incremental_minhash_pairs`, returning the
    DELTA index rows instead of the unioned store — the shape an append-only
    persisted store needs (the streaming near-dup sink writes exactly these
    rows run-tagged; re-reading + rewriting the whole store per batch would
    be O(corpus) per micro-batch)."""
    if (band_store is None) != (sig_store is None):
        raise ValueError("band_store and sig_store must both be None or both set")
    delta_bands, delta_sigs = minhash_index(
        new_docs, content_col, id_col, shingle_n, bands, rows_per_band, hash_family
    )
    if band_store is None:
        all_bands, all_sigs = delta_bands, delta_sigs
    else:
        # Replay guard: a re-submitted id (crash replay, re-crawl of an
        # unchanged page) must not append duplicate index rows — every later
        # delta would then emit each of its pairs twice via the fanned-out
        # signature join.  Already-indexed ids drop out of the delta entirely.
        known = sig_store.select("id")
        delta_sigs = delta_sigs.join(known, "id", "left_anti")
        delta_bands = delta_bands.join(known, "id", "left_anti")
        all_bands = band_store.unionByName(delta_bands)
        all_sigs = sig_store.unionByName(delta_sigs)

    cand = (
        delta_bands.alias("l")
        .join(
            all_bands.alias("r"),
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.bhash") == F.col("r.bhash"))
            & (F.col("l.id") != F.col("r.id")),
        )
        .select(
            F.least("l.id", "r.id").alias("a"),
            F.greatest("l.id", "r.id").alias("b"),
        )
        .dropDuplicates(["a", "b"])
    )
    verified = (
        cand.join(all_sigs.select(F.col("id").alias("a"), F.col("sig").alias("sa")), "a")
        .join(all_sigs.select(F.col("id").alias("b"), F.col("sig").alias("sb")), "b")
        .select(
            "a",
            "b",
            F.aggregate(
                F.zip_with("sa", "sb", lambda x, y: (x == y).cast("int")),
                F.lit(0),
                lambda acc, v: acc + v,
            ).alias("n_match_i"),
        )
        .filter(F.col("n_match_i") >= min_matches)
    )
    return verified, delta_bands, delta_sigs


def elect_keepers_by_quality(
    ids: DataFrame,
    pairs: DataFrame,
    scores: DataFrame,
    id_col: str = "id",
    score_col: str = "score_i",
) -> DataFrame:
    """Quality-aware keeper election: given the corpus id set, near-dup PAIR
    edges (a, b), and a per-id quality score, elect each dup group's keeper
    as the HIGHEST-scoring member (ties → smallest id) instead of the min-id
    default — what a real curation pipeline does (keep the best-rendered
    mirror, not the lexicographically first url).

    Returns (id, keep_id, score_i) for EVERY input id (singletons keep
    themselves).  Scale shape: connected components over the pair edges
    (size-adaptive, operators/canonicalize.py), one exchange keyed on the
    component for the argmax window — groups are near-dup families, so the
    window partitions are tiny by the over-merge invariant."""
    base = ids.select(F.col(id_col).alias("id")).join(
        scores.select(F.col(id_col).alias("id"), F.col(score_col).alias("score_i")),
        "id",
        "left",
    )
    comp = connected_components(pairs.select("a", "b")).select(
        F.col("alias").alias("id"), F.col("component").alias("grp")
    )
    withg = base.join(comp, "id", "left").withColumn(
        "grp", F.coalesce(F.col("grp"), F.col("id"))
    )
    w = Window.partitionBy("grp").orderBy(
        F.desc_nulls_last("score_i"), F.asc("id")
    )
    keep = (
        withg.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select(F.col("grp"), F.col("id").alias("keep_id"))
    )
    return withg.join(keep, "grp").select("id", "keep_id", "score_i")


def contrastive_triplets(
    pairs: DataFrame,
    ids: DataFrame,
    id_col: str = "doc_id",
    probe_mod: int = 37,
) -> DataFrame:
    """(anchor, pos_id, neg_id) — contrastive training triplets for
    embedding-model fine-tuning, mined from a near-dup pair table: the
    POSITIVE is the anchor's best near-duplicate (max jaccard, tie → min
    partner id), the NEGATIVE is a content-addressed random non-duplicate.

    Negative sampling at scale: candidates come from a HASH-PROBE subset
    (fingerprint(id) % probe_mod == 0 — ~1/probe_mod of the corpus,
    broadcastable) rather than a corpus-wide argmin; within the probe the
    winner is argmin md5(anchor:cand) (rerun/retry-stable, no RNG state),
    excluding the anchor itself, its positive, and ANY of its near-dup
    partners (a false negative poisons the contrastive loss).

    100 TB shape: the pair table is the (already skinny) LSH output; the
    probe broadcast makes negative assignment a narrow map per anchor; both
    argmax/argmin windows partition by anchor.
    """
    from aiwhispr_spark.operators.textstats import fingerprint_expr

    sym = pairs.select(
        F.col("a").alias("anchor"), F.col("b").alias("pos"), "jaccard"
    ).unionByName(
        pairs.select(F.col("b").alias("anchor"), F.col("a").alias("pos"), "jaccard")
    )
    # order by jaccard scaled at 1e4 — the SAME unit the pair-table oracles
    # (_minhash_cte's jaccard_i) rank by; a finer election unit here could
    # pick a different positive than the oracle on 1e4-rounding ties
    sym = sym.withColumn("_j", F.round(F.col("jaccard") * 10_000).cast("long"))
    # sym feeds TWO plan branches (election window + the false-negative
    # anti-join); checkpoint the skinny pair frame or the whole upstream
    # LSH chain executes twice
    sym = sym.localCheckpoint(eager=True)
    w_pos = Window.partitionBy("anchor").orderBy(F.col("_j").desc(), F.col("pos"))
    best = (
        sym.withColumn("_rn", F.row_number().over(w_pos))
        .filter(F.col("_rn") == 1)
        .select("anchor", "pos")
    )
    probe = ids.select(F.col(id_col).alias("cand")).filter(
        fingerprint_expr(F.col("cand").cast("string")) % probe_mod == 0
    )
    linked = sym.select("anchor", F.col("pos").alias("cand"))
    cand = (
        best.crossJoin(F.broadcast(probe))
        .filter((F.col("cand") != F.col("anchor")) & (F.col("cand") != F.col("pos")))
        .join(linked, ["anchor", "cand"], "left_anti")
        .withColumn(
            "_h",
            F.md5(
                F.concat(
                    F.col("anchor").cast("string"), F.lit(":"), F.col("cand").cast("string")
                )
            ),
        )
    )
    w_neg = Window.partitionBy("anchor").orderBy("_h", "cand")
    return (
        cand.withColumn("_rn", F.row_number().over(w_neg))
        .filter(F.col("_rn") == 1)
        .select("anchor", F.col("pos").alias("pos_id"), F.col("cand").alias("neg_id"))
    )


def _ppjoin_parts(
    df: DataFrame,
    content_col: str,
    id_col: str,
    threshold: float,
    scale: int,
) -> tuple[DataFrame, DataFrame]:
    """Shared machinery for :func:`ppjoin_jaccard_pairs` — returns
    ``(base, candidates)`` where ``base = (id, toks, sz)`` and
    ``candidates = (a, b)`` distinct pairs surviving the prefix + length
    filters.  Split out so tests can count candidates and assert the
    pruning is non-vacuous (the wand_prune_stats pattern)."""
    t_i = int(round(scale * threshold))
    base = df.select(
        F.col(id_col).alias("id"),
        F.array_distinct(
            F.filter(
                F.split(F.lower(F.trim(F.col(content_col))), r"\s+"),
                lambda x: x != F.lit(""),
            )
        ).alias("toks"),
    ).filter(F.size("toks") > 0)
    base = base.select("id", "toks", F.size("toks").cast("long").alias("sz"))
    post = base.select("id", "sz", F.explode("toks").alias("tok"))
    # Global token order = (document frequency asc, token asc).  Any TOTAL
    # order preserves exactness; rare-first maximises pruning because the
    # prefix then holds the most selective tokens.  The (df, tok) struct IS
    # the sort key — no global row_number / dense-rank pass over the vocab.
    dfreq = post.groupBy("tok").agg(F.count(F.lit(1)).alias("tdf"))
    ordered = (
        post.join(dfreq, "tok")
        .groupBy("id", "sz")
        .agg(F.sort_array(F.collect_list(F.struct("tdf", "tok"))).alias("ord"))
    )
    # prefix length = sz - ceil(t*sz) + 1; ceil via INTEGER div (the `/`
    # operator is double division — exact only below 2^53, and this
    # operator's whole contract is exactness)
    pref_len = F.expr(
        f"CAST(sz - (({t_i} * sz + {int(scale) - 1}) div {int(scale)}) + 1 AS INT)"
    )
    pref = ordered.select(
        "id",
        "sz",
        F.explode(F.slice(F.col("ord"), 1, pref_len)).alias("p"),
    ).select("id", "sz", F.col("p.tok").alias("ptok"))
    cand = (
        pref.alias("l")
        .join(
            pref.alias("r"),
            (F.col("l.ptok") == F.col("r.ptok"))
            & (F.col("l.id") < F.col("r.id"))
            # length filter: J >= t requires t*max(|a|,|b|) <= min(|a|,|b|)
            & (
                F.lit(t_i) * F.greatest("l.sz", "r.sz")
                <= F.lit(scale) * F.least("l.sz", "r.sz")
            ),
        )
        .select(F.col("l.id").alias("a"), F.col("r.id").alias("b"))
        .distinct()
    )
    return base, cand


def ppjoin_jaccard_pairs(
    df: DataFrame,
    content_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.8,
    scale: int = 1_000_000,
) -> DataFrame:
    """EXACT all-pairs token-Jaccard join with prefix filtering (AllPairs /
    PPJoin, Bayardo et al. 2007 "Scaling Up All Pairs Similarity Search";
    Xiao et al. 2008).  Unlike the recall-lossy df-capped candidate paths
    (:func:`containment_pairs`) or the probabilistic LSH band join, prefix
    filtering is EXACTNESS-PRESERVING: order every doc's distinct tokens by
    one global total order (document frequency asc, token asc) and a pair
    with ``J >= t`` must share at least one token within each doc's first
    ``|d| - ceil(t*|d|) + 1`` tokens — so joining on prefix tokens only
    loses nothing, while the candidate join touches the rare end of the
    vocabulary instead of every posting.

    At 100 TB the prefix join shuffles (id, sz, prefix-token) rows where a
    naive token self-join shuffles FULL posting lists of boilerplate tokens
    (the df-descending tail dominates: a token appearing in 1% of docs
    yields 10^14-scale candidate pairs); the length filter then kills
    cross-size pairs before the verify re-joins full token arrays
    candidate-sized.  Verify is exact integer math: ``scale*c >=
    t_i*(n_a+n_b-c)``.

    Output: (a, b, n_a, n_b, n_common, jaccard_i) for unordered pairs with
    token Jaccard >= threshold.  Reference parity: the reference dedupes
    via content digests only (aiwhisprConstants + indexing loop); this is
    the training-pipeline near-dup tier over it."""
    t_i = int(round(scale * threshold))
    base, cand = _ppjoin_parts(df, content_col, id_col, threshold, scale)
    v = (
        cand.join(base.select(F.col("id").alias("a"), F.col("toks").alias("ta"),
                              F.col("sz").alias("n_a")), "a")
        .join(base.select(F.col("id").alias("b"), F.col("toks").alias("tb"),
                          F.col("sz").alias("n_b")), "b")
        .select(
            "a", "b", "n_a", "n_b",
            F.size(F.array_intersect("ta", "tb")).cast("long").alias("n_common"),
        )
    )
    return v.filter(
        F.lit(scale) * F.col("n_common")
        >= F.lit(t_i) * (F.col("n_a") + F.col("n_b") - F.col("n_common"))
    ).select(
        "a", "b", "n_a", "n_b", "n_common",
        F.expr(f"CAST(({int(scale)} * n_common) div (n_a + n_b - n_common) AS BIGINT)").alias(
            "jaccard_i"
        ),
    )
