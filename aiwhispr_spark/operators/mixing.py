"""Temperature-weighted source re-sampling for training-data mixing: flatten
a skewed source distribution by sampling source *s* at rate

    rate_s = min(1, base_frac · (n_max / n_s)^(1-alpha))

(UniMax/multilingual-temperature style: alpha=1 keeps natural proportions,
alpha→0 approaches uniform-over-sources; n_max is the largest source so the
head source is sampled at exactly ``base_frac`` and smaller sources are
boosted toward parity, capped at keeping everything).

The reference has no corpus-composition tooling; every pre-training pipeline
needs this between curation and packing, so it's first-class here.

Determinism discipline: the keep decision is ``md5(doc_id) % 1e6 <
rate_i`` with ``rate_i = round(1e6·rate_s)`` — the only float is ONE
per-source scalar (a pow of two exact integers, no cross-source float sum
anywhere), rounded to a scaled int before any comparison, so Spark and the
DuckDB oracle agree bit-for-bit and re-runs are reproducible (a rerun keeps
the SAME documents — sampling is content-addressed, not rng-state-addressed).

100 TB shape: one map-side-combinable count per source (tiny result), rates
BROADCAST back, keep-filter is a narrow projection.  One shuffle total, no
python.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from aiwhispr_spark.operators.textstats import fingerprint_expr

_BUCKETS = 1_000_000


def _bucket(id_col: Column) -> Column:
    # the repo's one md5→60-bit fingerprint discipline, folded to [0, 1e6)
    return fingerprint_expr(id_col.cast("string")) % _BUCKETS


def source_rates(
    docs: DataFrame,
    source_col: str = "source",
    alpha: float = 0.5,
    base_frac: float = 0.5,
) -> DataFrame:
    """(source, n_s, rate_i) — scaled-int sampling rate per source."""
    counts = docs.groupBy(source_col).agg(F.count(F.lit(1)).alias("n_s"))
    n_max = counts.agg(F.max("n_s").alias("n_max"))
    rate = (
        F.pow(F.col("n_max").cast("double") / F.col("n_s"), F.lit(1.0 - alpha))
        * F.lit(base_frac)
        * F.lit(float(_BUCKETS))
    )
    return counts.crossJoin(F.broadcast(n_max)).select(
        source_col,
        F.col("n_s").cast("long").alias("n_s"),
        F.least(F.lit(float(_BUCKETS)), F.round(rate)).cast("bigint").alias("rate_i"),
    )


def temperature_sample(
    docs: DataFrame,
    source_col: str = "source",
    id_col: str = "doc_id",
    alpha: float = 0.5,
    base_frac: float = 0.5,
) -> DataFrame:
    """The sampled corpus: input rows whose id-bucket falls under their
    source's rate, with ``rate_i`` attached for audit."""
    rates = source_rates(docs, source_col, alpha, base_frac)
    return docs.join(
        F.broadcast(rates.select(source_col, "rate_i")), source_col
    ).filter(_bucket(F.col(id_col)) < F.col("rate_i"))


def perplexity_buckets(
    scored: DataFrame,
    lang_col: str = "lang",
    nll_col: str = "mean_nll_i",
    id_col: str = "doc_id",
) -> DataFrame:
    """CCNet-style head/middle/tail bucketing (Wenzek et al. 2020): within
    each language, split documents into terciles of the LM quality score —
    the canonical web-corpus partition (train on head+middle, drop or
    down-weight tail).  ``nll_col`` is a per-document scaled-int mean
    negative-log-likelihood (LOWER = more fluent = head); pair with
    textstats.unigram_logprob_scores via ``mean_nll_i = -sum_logp_i div
    n_tokens`` — negate FIRST so the integer division runs on non-negative
    values (truncation == floor, the cross-engine `div` trap).

    Bucket rule (deterministic, engine-reproducible): per language, t_lo /
    t_hi are the discrete 1/3 and 2/3 quantiles (percentile_approx at max
    accuracy — EXACT, equals DuckDB quantile_disc); head = nll <= t_lo,
    middle = t_lo < nll <= t_hi, tail = nll > t_hi.  Ties share a bucket by
    value, so no row-order dependence exists.

    100 TB shape: ONE map-side-combinable aggregate down to |languages|
    threshold rows, broadcast back, then a narrow CASE projection — the
    corpus never shuffles (the naive per-language ntile window would drag
    every row through a per-language sort).
    """
    pa = F.percentile_approx(
        F.col(nll_col), F.lit([1.0 / 3.0, 2.0 / 3.0]), F.lit(2147483647)
    )
    thresholds = scored.groupBy(F.col(lang_col).alias("_lang")).agg(
        F.element_at(pa, 1).cast("long").alias("_t_lo"),
        F.element_at(pa, 2).cast("long").alias("_t_hi"),
    )
    joined = scored.join(
        F.broadcast(thresholds), scored[lang_col] == thresholds["_lang"]
    )
    nll = F.col(nll_col)
    return joined.select(
        id_col,
        lang_col,
        nll_col,
        F.col("_t_lo").alias("t_lo_i"),
        F.col("_t_hi").alias("t_hi_i"),
        F.when(nll <= F.col("_t_lo"), F.lit("head"))
        .when(nll <= F.col("_t_hi"), F.lit("middle"))
        .otherwise(F.lit("tail"))
        .alias("bucket"),
    )


def weighted_sample_keys(
    df: DataFrame,
    weight_col: str,
    id_col: str = "doc_id",
    seed: str = "es1",
) -> Column:
    """Efraimidis–Spirakis priority key ``ln(u) / w`` with ``u`` derived from
    the repo's one md5→60-bit fingerprint discipline: ``u = (fp60(seed || id)
    + 1) / 2^60 ∈ (0, 1]``.  Ranking by this key DESC and keeping the top k
    is EXACTLY weighted sampling without replacement with inclusion odds
    proportional to ``w`` (Efraimidis & Spirakis 2006, via u^(1/w) ↦
    monotone ln(u)/w) — and it is content-addressed: a rerun, a task retry,
    or the DuckDB oracle derives the SAME priorities, no rng state.

    The single float is ``ln`` of a dyadic rational both engines round
    identically; a cross-engine ulp flip would need two priorities closer
    than 2^-50, vanishing at corpus-real candidate counts (tie-break on id
    regardless).
    """
    fp = fingerprint_expr(F.concat(F.lit(seed + "|"), F.col(id_col).cast("string")))
    u = (fp.cast("double") + F.lit(1.0)) / F.lit(float(1 << 60))
    return F.log(u) / F.col(weight_col).cast("double")


def weighted_sample_without_replacement(
    df: DataFrame,
    k: int,
    weight_col: str,
    group_col: str = "source",
    id_col: str = "doc_id",
    seed: str = "es1",
) -> DataFrame:
    """(group, doc_id, rk): k documents per group, drawn WITHOUT replacement
    with probability proportional to ``weight_col`` (quality-weighted
    subcorpus election — the step after scoring and before mixing, when the
    budget says "keep k docs per source, prefer the good ones but keep
    diversity", where deterministic top-k-by-quality would collapse onto
    near-duplicate top scorers).

    100 TB shape: the window sorts only (group, priority, id) — ~24-byte
    rows, independent of document size; weights must be strictly positive
    (filtered, not NULL-poisoned).
    """
    from pyspark.sql.window import Window

    key = weighted_sample_keys(df, weight_col, id_col=id_col, seed=seed)
    w = Window.partitionBy("grp").orderBy(F.desc("es_key"), F.col("id"))
    return (
        df.filter(F.col(weight_col).cast("double") > 0)
        .select(
            F.col(group_col).alias("grp"),
            F.col(id_col).alias("id"),
            key.alias("es_key"),
        )
        .withColumn("rk", F.row_number().over(w).cast("int"))
        .filter(F.col("rk") <= k)
        .select(
            F.col("grp").alias(group_col),
            F.col("id").alias(id_col),
            "rk",
        )
    )


def epoch_allocation(
    sources: DataFrame,
    budget_tokens: int,
    max_epochs: int = 4,
    source_col: str = "source",
    tokens_col: str = "n_tokens",
) -> DataFrame:
    """(source, n_tokens, cap_tokens, alloc_tokens, capped, epochs_mi) —
    UniMax-style epoch-capped budget WATER-FILL (Chung et al. 2023): give
    every source an equal share of the token budget, except no source may
    repeat more than ``max_epochs`` times; budget freed by capped (small)
    sources redistributes equally among the rest.

    Exact integer closed form (no iteration): sort by cap = n·E ascending;
    source i is capped iff cap_i·(S−i+1) ≤ B − prefix_cap_{i−1} — once the
    test fails it can never pass again (caps ascend), so the flag column IS
    the sequential water-fill.  Uncapped sources get ``(B − Σ capped caps)
    div (S − T)`` (the ≤ S−T−1 remainder tokens stay unallocated — floor
    share, deterministic); ``epochs_mi = alloc·10000 div n``.

    100 TB shape: the frame is the SOURCE REGISTRY (dozens of rows — the
    corpus never enters), so the single-partition ordering window is
    registry-sized by construction; the two 1-row stats broadcast.
    """
    from pyspark.sql.window import Window

    b, e = int(budget_tokens), int(max_epochs)
    rows = sources.select(
        F.col(source_col).alias("source"),
        F.col(tokens_col).cast("long").alias("n_tokens"),
    )
    # NULL/zero-token sources stay VISIBLE with a zero allocation (they
    # cannot absorb budget, but silently dropping registry rows is the
    # linededup-NULL-doc bug class); they never enter S or the prefix sums
    ineligible = rows.filter(
        F.col("n_tokens").isNull() | (F.col("n_tokens") <= 0)
    ).select(
        "source",
        F.coalesce("n_tokens", F.lit(0)).cast("long").alias("n_tokens"),
        F.lit(0).cast("long").alias("cap_tokens"),
        F.lit(0).cast("long").alias("alloc_tokens"),
        F.lit(0).cast("int").alias("capped"),
        F.lit(0).cast("long").alias("epochs_mi"),
    )
    base = rows.filter(F.col("n_tokens") > 0).withColumn(
        "cap_tokens", (F.col("n_tokens") * e).cast("long")
    )
    w = Window.orderBy("cap_tokens", "source")
    n_src = base.agg(F.count(F.lit(1)).cast("long").alias("s_total"))
    seq = (
        base.withColumn("_i", F.row_number().over(w))
        .withColumn(
            "_pprev",
            F.coalesce(
                F.sum("cap_tokens").over(
                    w.rowsBetween(Window.unboundedPreceding, -1)
                ),
                F.lit(0),
            ),
        )
        .crossJoin(F.broadcast(n_src))
        .withColumn(
            "capped",
            (
                F.col("cap_tokens") * (F.col("s_total") - F.col("_i") + 1)
                <= F.lit(b) - F.col("_pprev")
            ).cast("int"),
        )
    )
    fill = seq.agg(
        F.sum("capped").cast("long").alias("t_capped"),
        F.coalesce(
            F.sum(F.when(F.col("capped") == 1, F.col("cap_tokens"))), F.lit(0)
        ).cast("long").alias("p_capped"),
    )
    return (
        seq.crossJoin(F.broadcast(fill))
        .withColumn(
            "alloc_tokens",
            F.when(F.col("capped") == 1, F.col("cap_tokens"))
            .when(
                F.col("s_total") > F.col("t_capped"),
                F.expr(f"({b} - p_capped) div (s_total - t_capped)"),
            )
            .otherwise(F.lit(0))  # unreachable: every row capped ⇒ no uncapped row
            .cast("long"),
        )
        .select(
            "source",
            "n_tokens",
            "cap_tokens",
            "alloc_tokens",
            "capped",
            F.expr("(alloc_tokens * 10000) div n_tokens").cast("long").alias("epochs_mi"),
        )
        .unionByName(ineligible)
    )


def _pow2_bucket(text_col: str, seq_len_cap: int) -> Column:
    """Smallest power of 2 ≥ whitespace-token count, capped; bit-length
    trick (1<<length(bin(n−1))) — no float log2."""
    # NULL text counts as empty — a NULL bucket would sort NULLS FIRST in
    # Spark but NULLS LAST in DuckDB, silently breaking downstream orders
    t = F.trim(F.coalesce(F.col(text_col), F.lit("")))
    n_tok = F.when(t == "", F.lit(0)).otherwise(F.size(F.split(F.lower(t), r"\s+")))
    capped = F.least(n_tok, F.lit(seq_len_cap))
    # pyspark's shiftleft wants a python-int bit count, so the power comes
    # from pow(2, bits): exact in IEEE double for bits ≤ 52, cast back to
    # long — the BIT COUNT (length(bin(n-1))) is still pure integer, which
    # is where float log2 would have been boundary-unsafe
    bucket = (
        F.when(capped <= 1, F.lit(1))
        .otherwise(F.pow(F.lit(2.0), F.length(F.bin(capped - 1))).cast("long"))
        .cast("long")
    )
    return bucket, capped


def sequence_length_buckets(
    docs: DataFrame,
    text_col: str = "text",
    seq_len_cap: int = 4096,
) -> DataFrame:
    """(bucket, n_docs, sum_tokens, pad_tokens, waste_i) — power-of-2
    length bucketing, the batching layout every trainer uses when it does
    NOT pack: each doc pads to its bucket's size, so the per-bucket
    padding waste (bucket·n − Σtokens) is the number the packing pipeline
    (pack_greedy) exists to reclaim.  Bucket = smallest power of 2 ≥
    n_tokens, capped at ``seq_len_cap`` (longer docs truncate upstream —
    they report in the cap bucket with zero individual pad accounting
    beyond the cap).

    Integer-exact both engines: the power is 1<<length(bin(n−1)) — a bit-
    length trick, no float log2 (whose exactness at powers of 2 invites
    off-by-one at bucket boundaries).

    100 TB shape: one JVM token count per doc, one map-side-combinable
    groupBy onto ≤ log₂(cap) keys.  No python, no window.
    """
    bucket, capped = _pow2_bucket(text_col, seq_len_cap)
    per = docs.select(bucket.alias("bucket"), capped.cast("long").alias("n"))
    return (
        per.filter(F.col("n") > 0)
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("n").cast("long").alias("sum_tokens"),
        )
        .select(
            "bucket",
            "n_docs",
            "sum_tokens",
            (F.col("bucket") * F.col("n_docs") - F.col("sum_tokens"))
            .cast("long")
            .alias("pad_tokens"),
            F.expr("((bucket * n_docs - sum_tokens) * 10000) div (bucket * n_docs)")
            .cast("long")
            .alias("waste_i"),
        )
    )


def excess_loss_domain_weights(
    docs: DataFrame,
    group_col: str = "source",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(grp, n_tokens, nll_mi, excess_mi, weight_mi) — one linear
    multiplicative-weights round of domain reweighting in the DoReMi /
    Group-DRO spirit (Xie et al. 2023): domains whose loss under the
    proxy model exceeds the corpus mean get upweighted proportionally to
    their excess.  The proxy here is the corpus-self unigram NLL
    (unigram_logprob_scores — the same stand-in ccnet_perplexity_buckets
    uses), and the update is LINEAR (η=1) rather than exponentiated so
    the whole chain stays integer-exact: w_d ∝ tokens_d·(1e6+excess_mi),
    normalized to parts-per-million by one integer division.

    100 TB shape: rides unigram_logprob_scores' two token-keyed shuffles,
    then a |domains|-row aggregate; the corpus mean is a 1-row broadcast.
    """
    from aiwhispr_spark.operators.textstats import unigram_logprob_scores

    scores = unigram_logprob_scores(docs, text_col=text_col, id_col=id_col)
    per_doc = docs.select(F.col(id_col), F.col(group_col).alias("grp")).join(
        scores, id_col
    )
    dom = per_doc.groupBy("grp").agg(
        F.sum("n_tokens").cast("long").alias("n_tokens"),
        F.sum("sum_logp_i").cast("long").alias("_sum_logp_i"),
    )
    # mean NLL per token, scaled 1e6 (sum_logp_i is already 1e6-scaled):
    # nll_mi = (−Σlogp_i) div Σtokens
    dom = dom.withColumn(
        "nll_mi", F.expr("(-_sum_logp_i) div n_tokens").cast("long")
    )
    corpus = dom.agg(
        F.sum("_sum_logp_i").alias("_cs"), F.sum("n_tokens").alias("_ct")
    ).select(F.expr("(-_cs) div _ct").cast("long").alias("_corpus_nll_mi"))
    w = dom.crossJoin(F.broadcast(corpus)).withColumn(
        "excess_mi",
        F.greatest(F.lit(0), F.col("nll_mi") - F.col("_corpus_nll_mi")).cast("long"),
    )
    w = w.withColumn("_score", F.col("n_tokens") * (F.lit(1000000) + F.col("excess_mi")))
    tot = w.agg(F.sum("_score").alias("_tot"))
    # normalize in double — score·1e6 would overflow int64 once
    # Σtokens·2e6 passes ~9e12, and the floor-denominator trick
    # (score div (tot div 1e6)) over-allocates when tot is small; one
    # round((score/tot)·1e6) is cross-engine exact (identical IEEE ops)
    # and within ½ ppm of true at every scale
    return (
        w.crossJoin(F.broadcast(tot))
        .select(
            "grp",
            "n_tokens",
            "nll_mi",
            "excess_mi",
            F.round(
                (F.col("_score").cast("double") / F.col("_tot")) * F.lit(1000000.0)
            )
            .cast("long")
            .alias("weight_mi"),
        )
    )


def curriculum_order(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    seq_len_cap: int = 4096,
) -> DataFrame:
    """(rank, doc_id, bucket) — shortest-first training curriculum: docs
    ordered by their power-of-2 length tier ascending (the Shortformer-
    style staged-length schedule), with a content-hash shuffle WITHIN
    each tier (md5('c:'||id) — deterministic, rerun-stable, no RNG state)
    so batches inside a stage stay i.i.d. rather than length-sorted.

    Rank is assigned by global_row_number — the range-exchange +
    per-partition-offset path (NOT a single-partition window), so the
    total order scales; its persist-pins-boundaries contract applies.

    100 TB shape: one narrow projection (id, tier, hash), one range
    exchange; no corpus-wide window, no collect beyond the per-partition
    count rows."""
    from aiwhispr_spark.operators.ranking import global_row_number

    bucket, _ = _pow2_bucket(text_col, seq_len_cap)
    base = docs.select(
        F.col(id_col),
        bucket.alias("bucket"),
        F.md5(F.concat(F.lit("c:"), F.col(id_col).cast("string"))).alias("_shuf"),
    )
    return global_row_number(
        base, [F.col("bucket"), F.col("_shuf"), F.col(id_col)], "rank"
    ).select("rank", id_col, "bucket")


def apportion_largest_remainder(
    df,
    key_col: str,
    weight_col: str,
    budget: int,
):
    """Hamilton largest-remainder apportionment of an integer budget across
    weighted keys (the seat-allocation method; here: sampling-budget or
    epoch-slot allocation across sources — the integer-exact complement to
    the UniMax water-fill).  quota_h = budget·w_h / W; every key gets
    ⌊quota⌋ and the R = budget − Σ⌊quota⌋ largest remainders get one more
    (ties: remainder desc, key asc).  Σ alloc = budget EXACTLY — no float
    quota ever drifts the total.  Zero/NULL-weight keys stay VISIBLE with
    alloc 0 (they also provably never win a remainder seat: Σrem = R·W
    with each rem < W).

    100 TB shape: one weight aggregate broadcast as (W, Σbase, i.e. R)
    literals; the remainder rank is a window over KEY-cardinality rows
    (sources, not documents) — the grouped-kfold discipline.

    Returns (key, weight, base_alloc, alloc)."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    b = int(budget)
    w = df.select(
        F.col(key_col).alias("key"),
        F.coalesce(F.col(weight_col), F.lit(0)).cast("long").alias("weight"),
    )
    tot = w.agg(F.sum("weight").cast("long").alias("wsum"))
    # wsum = 0 (all weights zero/NULL) is degenerate: every alloc is 0 —
    # defined, visible, and NOT the Σalloc=budget contract (stated here);
    # without the guard Spark's div/% return NULL and the twin diverges
    q = (
        w.crossJoin(F.broadcast(tot))
        .withColumn(
            "base_alloc",
            F.expr(
                f"CAST(CASE WHEN wsum = 0 THEN 0 "
                f"ELSE ({b} * weight) div wsum END AS BIGINT)"
            ),
        )
        .withColumn(
            "rem",
            F.expr(
                f"CAST(CASE WHEN wsum = 0 THEN 0 "
                f"ELSE ({b} * weight) % wsum END AS BIGINT)"
            ),
        )
    )
    r_tot = q.agg(
        (F.lit(b) - F.sum("base_alloc")).cast("long").alias("n_extra")
    )
    win = Window.orderBy(F.desc("rem"), F.col("key"))
    return (
        q.crossJoin(F.broadcast(r_tot))
        .withColumn("_rk", F.row_number().over(win))
        .select(
            "key",
            "weight",
            "base_alloc",
            # seats require a POSITIVE remainder: provably a no-op in the
            # normal case (R < #nonzero-rem keys), and it keeps the
            # degenerate wsum=0 frame (n_extra = budget, all rems 0) at 0
            (
                F.col("base_alloc")
                + ((F.col("_rk") <= F.col("n_extra")) & (F.col("rem") > 0)).cast("long")
            )
            .cast("long")
            .alias("alloc"),
        )
    )


def greedy_source_cover(
    df,
    source_col: str,
    item_col: str,
    k: int = 4,
):
    """Greedy weighted set cover for source selection (the classic (1−1/e)
    approximation): pick k sources one at a time, each maximizing the count
    of NOT-YET-COVERED items — the coverage-driven way to choose which
    corpora/domains enter a training mix when the budget is "k sources",
    complementing the token-budget allocators (waterfill, apportionment).

    Deterministic: ties break (gain desc, source asc).  Entirely
    declarative — the per-round winner stays a 1-ROW FRAME joined back
    (broadcast), never a driver collect; covered-set state localCheckpoints
    per round (the bounded-rounds iterative contract).  A round whose
    uncovered incidence is empty emits nothing (visible by absence of that
    round index — the cover is complete).

    100 TB shape: per round one (source)-keyed aggregate over the UNCOVERED
    incidence (which only shrinks) + one anti-join; k is small by contract.

    Returns (round, source, gain, covered_total)."""
    from pyspark.sql import functions as F

    inc = df.select(
        F.col(source_col).alias("src"), F.col(item_col).alias("item")
    ).distinct()
    out = None
    remaining = inc.localCheckpoint()
    for rnd in range(1, k + 1):
        gains = remaining.groupBy("src").agg(
            F.countDistinct("item").cast("long").alias("gain")
        )
        winner = gains.orderBy(F.desc("gain"), F.col("src")).limit(1)
        row = winner.select(
            F.lit(rnd).cast("long").alias("round"), "src", "gain"
        ).localCheckpoint()
        # join against the CHECKPOINTED row, not the lazy winner — otherwise
        # the gains aggregate + top-1 sort re-execute when remaining
        # materializes (2x the expensive step per round)
        new_cov = remaining.join(F.broadcast(row.select("src")), "src").select("item")
        remaining = remaining.join(new_cov, "item", "left_anti").localCheckpoint()
        out = row if out is None else out.unionByName(row)
    # cumulative coverage: running sum over the k-row result (k rows only)
    from pyspark.sql.window import Window

    w = Window.orderBy("round")
    return out.withColumn(
        "covered_total", F.sum("gain").over(w).cast("long")
    ).select("round", F.col("src").alias("source"), "gain", "covered_total")


def fractional_knapsack(
    df,
    key_col: str,
    value_col: str,
    cost_col: str,
    budget: int,
    scale: int = 1_000_000,
):
    """Fractional-knapsack crawl/compute budget allocation (the greedy
    value-density rule, optimal for the fractional relaxation): order keys
    by value/cost density, fund each fully until the budget boundary, fund
    the boundary key pro-rata, everything after gets zero — how a crawl
    scheduler spends N fetches across hosts priced by cost with estimated
    value.

    Integer contract: the sort key is ``ratio_i = value·scale div cost``
    (ties: key asc) — BOTH engines order by the same floored key, so
    near-equal densities order identically cross-engine even where exact
    rational order would differ from the floored order.  alloc =
    clamp(budget − prior cumulative cost, 0, cost); captured_mi =
    value·alloc·scale div cost (one floor; value·cost·scale must stay
    under 2^63 — drop scale for corpus-bytes-sized values).  Zero/NULL-cost keys stay
    VISIBLE with the −1 ratio sentinel and zero allocation (they can't be
    priced — route upstream), the linededup-NULL lesson; priced
    negative-value keys floor to density 0 (funded last, never confused
    with the sentinel).

    The density window is KEY-cardinality-sized (hosts, not documents —
    grouped_kfold discipline).  Returns (key, value, cost, ratio_i,
    alloc_cost, captured_mi)."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    b = int(budget)
    s = int(scale)
    base = df.select(
        F.col(key_col).alias("key"),
        F.coalesce(F.col(value_col), F.lit(0)).cast("long").alias("value"),
        F.coalesce(F.col(cost_col), F.lit(0)).cast("long").alias("cost"),
    ).withColumn(
        # priced keys floor to density >= 0 (negative value = worthless, not
        # unpriceable) so the -1 sentinel can NEVER collide with a computed
        # ratio
        "ratio_i",
        F.expr(
            f"CAST(CASE WHEN cost <= 0 THEN -1 "
            f"ELSE greatest(0, ({s} * value) div cost) END AS BIGINT)"
        ),
    )
    w = (
        Window.orderBy(F.desc("ratio_i"), F.col("key"))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    out = base.withColumn(
        "cum_prev", F.coalesce(F.sum(F.when(F.col("ratio_i") >= 0, F.col("cost"))).over(w), F.lit(0))
    ).withColumn(
        "alloc_cost",
        F.when(
            F.col("ratio_i") < 0, F.lit(0)
        ).otherwise(
            F.greatest(F.lit(0), F.least(F.col("cost"), F.lit(b) - F.col("cum_prev")))
        ).cast("long"),
    )
    return out.select(
        "key",
        "value",
        "cost",
        "ratio_i",
        "alloc_cost",
        F.expr(
            f"CAST(CASE WHEN cost <= 0 OR alloc_cost = 0 THEN 0 "
            f"ELSE (value * alloc_cost * {s}) div cost END AS BIGINT)"
        ).alias("captured_mi"),
    )
