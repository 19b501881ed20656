"""Temporal operators: as-of join (point-in-time lookup).

The reference has no as-of machinery (SURVEY.md §2.8) — this is one of the
idiomatic-Spark components our engine adds for training-data pipelines
(e.g. "attach the latest crawl snapshot / price / label known at event time").

Scale design: the naive formulation is an inequality join
(``l.key = r.key AND l.ts >= r.ts`` + argmax), which Spark executes as a
broadcast-nested-loop or a shuffled range join — quadratic per key.  Instead we
use the single-shuffle union+window plan:

    tag right rows (is_right=1) and left rows (is_right=0)
    → union → one shuffle on key
    → ``last(value, ignoreNulls) over (partition by key
         order by ts, is_right desc  rows unbounded preceding..current)``
    → keep left rows

Each row is touched once, the only shuffle is the window's hash partition on
key, and skewed keys can reuse the same salting as operators/skew.py.  Right
rows sort *before* left rows at equal timestamps (is_right desc), giving the
inclusive ``l.ts >= r.ts`` semantics DuckDB's ASOF JOIN uses.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def bucketed_range_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    window_seconds: int = 3600,
) -> DataFrame:
    """Pairs (left row, right row) with the same `on` key and
    ``left_ts < right_ts <= left_ts + window_seconds``.

    Scale design: the naive inequality join degenerates to a per-key cross
    product (broadcast-nested-loop at best).  Instead both sides get a
    time-bucket key of width ``window_seconds``; a qualifying right row lies
    in the left row's bucket or the next one, so the left side is exploded to
    those two candidate buckets and the join is a plain equi-join on
    (key, bucket) — hash-partitioned, AQE-skew-splittable — followed by the
    exact range filter.  Candidate blowup is bounded: 2× left rows, and each
    pair candidate is within one bucket of qualifying.

    Returns all left columns plus the right columns suffixed ``_r``.
    """
    bucket_l = F.floor(F.unix_timestamp(F.col(left_ts)) / window_seconds)
    bucket_r = F.floor(F.unix_timestamp(F.col(right_ts)) / window_seconds)
    l = left.withColumn("_bucket", F.explode(F.array(bucket_l, bucket_l + 1)))
    r = right.select(
        F.col(on),
        F.col(right_ts).alias("_rts"),
        bucket_r.alias("_bucket"),
        *[
            F.col(c).alias(f"{c}_r")
            for c in right.columns
            if c not in (on, right_ts)
        ],
    )
    pairs = l.join(r, [on, "_bucket"]).filter(
        (F.col("_rts") > F.col(left_ts))
        & (F.col("_rts") <= F.col(left_ts) + F.expr(f"INTERVAL {window_seconds} SECOND"))
    )
    return pairs.drop("_bucket").withColumnRenamed("_rts", f"{right_ts}_r")


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    value_cols: Sequence[str] = (),
) -> DataFrame:
    """Left as-of join: every `left` row gains each `value_cols` column from
    the latest `right` row with the same `on` key and ``right_ts <= left_ts``
    (NULL when no such row).  `right` must be unique per (on, right_ts) —
    pre-aggregate otherwise (duplicate event times make any as-of join
    nondeterministic; DuckDB imposes the same requirement).
    """
    value_cols = list(value_cols)
    if not value_cols:
        return left
    # ALL value columns ride in ONE struct per right row: last(ignorenulls)
    # over the struct picks the as-of row atomically, so a legitimately-NULL
    # value in the matched row stays NULL (instead of being back-filled from
    # an older right row) and every column comes from the SAME right row —
    # matching DuckDB ASOF JOIN semantics.  The struct itself is non-null for
    # every right row, null for left rows, so it never skips a matched row.
    l_tagged = left.select(
        F.col(on).alias("_k"),
        F.col(left_ts).alias("_t"),
        F.lit(0).alias("_is_right"),
        F.struct(*left.columns).alias("_left"),
        F.lit(None)
        .cast(
            # backtick-quote field names: DDL parsing must survive spaces /
            # metachars in value-column names
            "struct<"
            + ",".join(
                f"`{c}`:{right.schema[c].dataType.simpleString()}" for c in value_cols
            )
            + ">"
        )
        .alias("_vals"),
    )
    r_tagged = right.select(
        F.col(on).alias("_k"),
        F.col(right_ts).alias("_t"),
        F.lit(1).alias("_is_right"),
        F.lit(None).cast(l_tagged.schema["_left"].dataType).alias("_left"),
        # right[c] (not F.col(c)): resolves names containing dots literally
        F.struct(*[right[c] for c in value_cols]).alias("_vals"),
    )
    w = (
        Window.partitionBy("_k")
        .orderBy(F.col("_t").asc(), F.col("_is_right").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = l_tagged.unionByName(r_tagged).select(
        "_left",
        "_is_right",
        F.last("_vals", ignorenulls=True).over(w).alias("_vals"),
    )
    return filled.filter(F.col("_is_right") == 0).select(
        "_left.*", *[F.col("_vals").getField(c).alias(c) for c in value_cols]
    )


def assign_crawl_sessions(
    df: DataFrame,
    key_col: str = "host",
    ts_col: str = "ep",
    gap_seconds: int = 3600,
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Gap-based session ASSIGNMENT (batch): append ``session_id`` =
    ``<key>@<session_start>`` to every row, where a session is a maximal run
    of same-key rows whose consecutive ``ts_col`` gaps are ≤ ``gap_seconds``
    and session_start is the session's first timestamp.

    This is the batch twin of the streaming doc sessionizer
    (streaming/kg_stream.py::sessionize_docs_stream): over in-order input the
    two assign IDENTICAL session ids (test-pinned), which is what lets
    session-scoped triple provenance be recomputed offline.

    Differs from the closed-session AGGREGATION (events_sessionize /
    streaming/stateful.py) in that it labels the input rows instead of
    emitting one row per session.  Scale: two windows over the same (key, ts)
    partitioning — one shuffle, each task holds one key group.  Pass
    ``tiebreak_col`` when timestamps can tie within a key."""
    order = [F.col(ts_col)] + ([F.col(tiebreak_col)] if tiebreak_col else [])
    w = Window.partitionBy(key_col).orderBy(*order)
    lagged = F.lag(ts_col).over(w)
    new_s = F.when(
        lagged.isNull() | ((F.col(ts_col) - lagged) > gap_seconds), 1
    ).otherwise(0)
    run = F.sum("_new_session").over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_sess = Window.partitionBy(key_col, "_session_no")
    return (
        df.withColumn("_new_session", new_s)
        .withColumn("_session_no", run)
        .withColumn(
            "session_id",
            F.concat(
                F.col(key_col),
                F.lit("@"),
                F.min(ts_col).over(w_sess).cast("long").cast("string"),
            ),
        )
        .drop("_new_session", "_session_no")
    )


def triple_temporal_extent(
    observed: DataFrame,
    ts_col: str = "ts",
    src_col: str = "url",
    subj_col: str = "subj",
    pred_col: str = "pred",
    obj_col: str = "obj",
) -> DataFrame:
    """Fact lifespan over a re-crawled corpus: per distinct (subj, pred, obj),
    when it was FIRST asserted, when LAST, how many crawl snapshots carried
    it, and how many distinct source pages — the temporal-KG provenance a
    downstream consumer needs to distinguish a stable fact (long extent, many
    sources) from a transient one (single snapshot).

    100 TB shape: ONE map-side-combinable aggregation keyed on the triple —
    no window, no sort; min/max/count/count-distinct all partial-aggregate
    before the exchange, so the shuffle carries one row per distinct triple
    per map partition, never the observation stream."""
    return observed.groupBy(
        F.col(subj_col).alias("subj"),
        F.col(pred_col).alias("pred"),
        F.col(obj_col).alias("obj"),
    ).agg(
        F.min(ts_col).cast("long").alias("first_seen"),
        F.max(ts_col).cast("long").alias("last_seen"),
        F.count(F.lit(1)).cast("long").alias("n_observations"),
        F.countDistinct(src_col).cast("long").alias("n_sources"),
        (F.max(ts_col) - F.min(ts_col)).cast("long").alias("extent"),
    )


def coalesce_fact_intervals(
    observed: DataFrame,
    gap: int,
    ts_col: str = "ts",
    subj_col: str = "subj",
    pred_col: str = "pred",
    obj_col: str = "obj",
) -> DataFrame:
    """Validity-interval coalescing (gaps-and-islands) per distinct fact:
    consecutive observations ≤ ``gap`` apart merge into one validity island;
    a silence longer than ``gap`` closes the interval and opens a new one —
    the temporal-KG refinement of :func:`triple_temporal_extent` (which
    reports ONE envelope even when a fact disappeared for years between
    crawls).  Output: (subj, pred, obj, valid_from, valid_to, n_obs), one
    row per island, exact integer timestamps.

    Scale shape: one window partitioned by the FACT KEY (never global) for
    the lag + running island counter, then a map-side-combinable aggregate
    on (fact, island).  Per-fact observation counts are crawl-frequency
    bounded — no skew beyond what the triple distinct already carries."""
    from pyspark.sql.window import Window

    w = Window.partitionBy("subj", "pred", "obj").orderBy("ts")
    prev = F.lag("ts").over(w)
    flagged = observed.select(
        F.col(subj_col).alias("subj"),
        F.col(pred_col).alias("pred"),
        F.col(obj_col).alias("obj"),
        F.col(ts_col).cast("long").alias("ts"),
    ).withColumn(
        "new_island",
        F.when(prev.isNull() | (F.col("ts") - prev > gap), 1).otherwise(0),
    )
    island = flagged.withColumn(
        "island",
        F.sum("new_island").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    return island.groupBy("subj", "pred", "obj", "island").agg(
        F.min("ts").alias("valid_from"),
        F.max("ts").alias("valid_to"),
        F.count(F.lit(1)).cast("long").alias("n_obs"),
    ).drop("island")


_DATED_ACQ_RE = (
    r"^([A-Z][A-Za-z0-9_ ]*?) acquired ([A-Za-z0-9_ ]+?) "
    r"(in|since|until) ((?:1[89]|20)\d\d)\.$"
)
_DATED_BASED_RE = (
    r"^([A-Z][A-Za-z0-9_ ]*?) (?:is|was|has been) based in ([A-Za-z0-9_ ]+?) "
    r"(in|since|until) ((?:1[89]|20)\d\d)\.$"
)


def extract_dated_facts(
    chunks: DataFrame,
    text_col: str = "text_chunk",
    id_col: str = "url",
) -> DataFrame:
    """Temporally-QUALIFIED triple extraction (Wikidata qualifier style):
    sentences of the form "<Subj> acquired <Obj> in 1994." / "<Subj> has
    been based in <Obj> since 2003." yield
    ``(url, subj, pred, obj, qualifier, year)`` — the input to
    point-in-time KG queries and to `triple_temporal_extent` when the TEXT
    (not the crawl clock) asserts the date.  Documented subset: the two
    verb frames, qualifier ∈ {in, since, until}, 4-digit years 18xx-20xx,
    sentence-final.

    100 TB shape: sentence explode + two regexes, one narrow JVM
    projection — no python stage, no exchange."""
    sents = chunks.select(
        F.col(id_col).alias("url"),
        F.explode(F.split(F.col(text_col), r"(?<=[.!?])\s+")).alias("sent"),
    )

    def _arm(rx: str, pred: str):
        return F.when(
            F.regexp_extract("sent", rx, 4) != "",
            F.struct(
                F.regexp_extract("sent", rx, 1).alias("subj"),
                F.lit(pred).alias("pred"),
                F.regexp_extract("sent", rx, 2).alias("obj"),
                F.regexp_extract("sent", rx, 3).alias("qualifier"),
                F.regexp_extract("sent", rx, 4).cast("int").alias("year"),
            ),
        )

    fact = F.coalesce(
        _arm(_DATED_ACQ_RE, "acquired"), _arm(_DATED_BASED_RE, "based_in")
    )
    return (
        sents.select("url", fact.alias("f"))
        .where(F.col("f").isNotNull())
        .select("url", "f.subj", "f.pred", "f.obj", "f.qualifier", "f.year")
    )


def facts_valid_at(dated: DataFrame, year: int) -> DataFrame:
    """Point-in-time filter over :func:`extract_dated_facts` output: keep the
    facts asserted valid at ``year`` — ``in y`` ⇒ y == year, ``since y`` ⇒
    y <= year, ``until y`` ⇒ y >= year.  A narrow filter (pushes into the
    scan of a year-partitioned qualified-triple table at scale)."""
    q = F.col("qualifier")
    y = F.col("year")
    return dated.where(
        ((q == "in") & (y == year))
        | ((q == "since") & (y <= year))
        | ((q == "until") & (y >= year))
    )


def kg_snapshot_diff(old: DataFrame, new: DataFrame) -> DataFrame:
    """Fact-level change report between two KG snapshots (crawl N vs crawl
    N+1): ``(subj, pred, obj_old, obj_new, change)`` with change ∈

    * ``changed`` — a (subj, pred) whose old snapshot lost EXACTLY ONE
      object and gained exactly one (the functional-fact update: HQ moved,
      CEO replaced).  Multi-valued churn is NOT paired up arbitrarily — it
      reports as independent removed/added rows;
    * ``removed`` / ``added`` — triples present in only one snapshot.

    Unchanged triples are excluded (the report is the delta, which is what
    KG versioning stores).  Deterministic: pairing only happens in the
    exactly-one-each case.

    100 TB shape: two anti-joins plus one equi-join, all keyed on
    (subj, pred[, obj]) — co-partitioned under one hash layout (the
    subject-bucketed store makes them exchange-free); counts for the
    exactly-one guard are map-side combinable."""
    cols = ["subj", "pred", "obj"]
    o = old.select(*cols).distinct()
    n = new.select(*cols).distinct()
    removed = o.join(n, cols, "left_anti")
    added = n.join(o, cols, "left_anti")

    def _singletons(df: DataFrame) -> DataFrame:
        return (
            df.groupBy("subj", "pred")
            .agg(F.count(F.lit(1)).alias("_c"), F.max("obj").alias("obj"))
            .where(F.col("_c") == 1)
            .drop("_c")
        )

    changed = (
        _singletons(removed)
        .withColumnRenamed("obj", "obj_old")
        .join(
            _singletons(added).withColumnRenamed("obj", "obj_new"),
            ["subj", "pred"],
        )
        .select("subj", "pred", "obj_old", "obj_new", F.lit("changed").alias("change"))
    )
    ckeys = changed.select("subj", "pred")
    pure_removed = removed.join(ckeys, ["subj", "pred"], "left_anti").select(
        "subj",
        "pred",
        F.col("obj").alias("obj_old"),
        F.lit(None).cast("string").alias("obj_new"),
        F.lit("removed").alias("change"),
    )
    pure_added = added.join(ckeys, ["subj", "pred"], "left_anti").select(
        "subj",
        "pred",
        F.lit(None).cast("string").alias("obj_old"),
        F.col("obj").alias("obj_new"),
        F.lit("added").alias("change"),
    )
    return changed.unionByName(pure_removed).unionByName(pure_added)


def resolve_functional_facts(
    observed: DataFrame,
    ts_col: str = "ts",
    subj_col: str = "subj",
    pred_col: str = "pred",
    obj_col: str = "obj",
) -> DataFrame:
    """Conflict resolution for FUNCTIONAL predicates (one true object per
    (subj, pred) — ceo_of, based_in, birth_date): latest observation wins
    (ties → lexicographically smallest object), with the conflict audit a
    KG consumer needs: how many distinct objects were ever asserted and
    whether the winner was contested.

    One (subj, pred)-keyed aggregation + one row_number window on the same
    key (partitioned, never global) — the window's partitions are a fact's
    observation list, bounded by re-crawl frequency."""
    from pyspark.sql.window import Window

    base = observed.select(
        F.col(subj_col).alias("subj"),
        F.col(pred_col).alias("pred"),
        F.col(obj_col).alias("obj"),
        F.col(ts_col).alias("ts"),
    )
    stats = base.groupBy("subj", "pred").agg(
        F.countDistinct("obj").cast("long").alias("n_distinct_obj"),
        F.count(F.lit(1)).cast("long").alias("n_observations"),
    )
    w = Window.partitionBy("subj", "pred").orderBy(F.desc("ts"), F.asc("obj"))
    latest = (
        base.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select("subj", "pred", F.col("obj").alias("resolved_obj"))
    )
    return stats.join(latest, ["subj", "pred"]).select(
        "subj",
        "pred",
        "resolved_obj",
        "n_distinct_obj",
        "n_observations",
        (F.col("n_distinct_obj") > 1).cast("long").alias("conflicted_i"),
    )


def source_reliability(
    observed: DataFrame,
    host_col: str = "host",
    subj_col: str = "subj",
    pred_col: str = "pred",
    obj_col: str = "obj",
    scale: int = 1_000_000,
) -> DataFrame:
    """Truth-discovery source scoring (majority-vote round of classic
    TruthFinder/Dawid-Skene iterations): per fact (subj, pred) the majority
    object (count DESC, obj ASC ties), then per source host the share of
    its assertions agreeing with the majority — ``reliability_i`` as an
    exact integer ratio (`div`, cross-engine reproducible).

    Scale shape: two fact-keyed aggregates (counts, then argmax via a
    fact-partitioned window over the DISTINCT (fact, obj) counts — not the
    observation stream) + one broadcast-sized join back; the host rollup
    map-side combines into |hosts| rows."""
    from pyspark.sql.window import Window

    base = observed.select(
        F.col(host_col).alias("host"),
        F.col(subj_col).alias("subj"),
        F.col(pred_col).alias("pred"),
        F.col(obj_col).alias("obj"),
    )
    votes = base.groupBy("subj", "pred", "obj").agg(
        F.count(F.lit(1)).alias("n")
    )
    w = Window.partitionBy("subj", "pred").orderBy(F.desc("n"), F.asc("obj"))
    majority = (
        votes.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select("subj", "pred", F.col("obj").alias("maj_obj"))
    )
    judged = base.join(majority, ["subj", "pred"]).withColumn(
        "agree", (F.col("obj") == F.col("maj_obj")).cast("long")
    )
    return (
        judged.groupBy("host")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_assertions"),
            F.sum("agree").cast("long").alias("n_majority"),
        )
        .withColumn(
            "reliability_i",
            F.expr(f"CAST(({int(scale)} * n_majority) div n_assertions AS BIGINT)"),
        )
    )


def truthfinder(
    observed: DataFrame,
    rounds: int = 3,
    host_col: str = "host",
    subj_col: str = "subj",
    pred_col: str = "pred",
    obj_col: str = "obj",
    scale: int = 1_000_000,
    output: str = "facts",
) -> DataFrame:
    """ITERATIVE truth discovery — the full trust ⇄ belief fixpoint that
    :func:`source_reliability` (one majority half-round) and
    :func:`fact_confidence` (one weighted half-round) approximate.  The
    update is the integer-exact Sums/Average variant (Pasternack & Roth
    2010's AverageLog without the log, TruthFinder's loop without the
    sigmoid — chosen so BOTH engines produce bit-identical integers):

      trust_0(h)   = scale
      belief_k(f)  = Σ_{h asserts f} trust_{k-1}(h)
      conf_k(f)    = scale·belief_k(f) div Σ_{f' ∈ group(f)} belief_k(f')
                     (group = facts competing for the same (subj, pred))
      trust_k(h)   = Σ_{f asserted by h} conf_k(f) div n_claims(h)

    One vote per DISTINCT (host, fact) — re-crawls never stuff the ballot.
    ``output='facts'`` → (subj, pred, obj, n_hosts, conf_i);
    ``output='trust'`` → (host, n_claims, trust_i).

    Scale shape per round: one host-keyed broadcast join (trust is
    |hosts|-sized), two fact-keyed map-side-combinable aggregates, one
    (subj, pred) group rollup — the vote frame persists once and every
    round reuses its partitioning; trust localCheckpoints per round
    (iterative-plan discipline)."""
    if rounds < 1:
        raise ValueError("rounds must be >= 1")
    if output not in ("facts", "trust"):
        raise ValueError("output must be 'facts' or 'trust'")
    votes = (
        observed.select(
            F.col(host_col).alias("host"),
            F.col(subj_col).alias("subj"),
            F.col(pred_col).alias("pred"),
            F.col(obj_col).alias("obj"),
        )
        .distinct()
        .persist()
    )
    trust = votes.select("host").distinct().withColumn(
        "trust_i", F.lit(int(scale)).cast("long")
    )
    conf = None
    for _ in range(rounds):
        belief = (
            votes.join(F.broadcast(trust), "host")
            .groupBy("subj", "pred", "obj")
            .agg(
                F.sum("trust_i").cast("long").alias("belief_i"),
                F.count(F.lit(1)).cast("long").alias("n_hosts"),
            )
        )
        group_tot = belief.groupBy("subj", "pred").agg(
            F.sum("belief_i").cast("long").alias("tot_i")
        )
        conf = belief.join(group_tot, ["subj", "pred"]).select(
            "subj",
            "pred",
            "obj",
            "n_hosts",
            F.expr(f"CAST(({int(scale)} * belief_i) div tot_i AS BIGINT)").alias(
                "conf_i"
            ),
        ).localCheckpoint()
        trust = (
            votes.join(conf.select("subj", "pred", "obj", "conf_i"), ["subj", "pred", "obj"])
            .groupBy("host")
            .agg(
                F.sum("conf_i").cast("long").alias("sum_conf"),
                F.count(F.lit(1)).cast("long").alias("n_claims"),
            )
            .select(
                "host",
                "n_claims",
                F.expr("CAST(sum_conf div n_claims AS BIGINT)").alias("trust_i"),
            )
        ).localCheckpoint()
    votes.unpersist()
    if output == "trust":
        return trust
    return conf


def mention_bursts(
    mentions: DataFrame,
    window_days: int = 7,
    factor_pm: int = 3000,
    min_count: int = 3,
    entity_col: str = "entity",
    day_col: str = "day",
) -> DataFrame:
    """Trending-entity detection over the mention timeline (Kleinberg-style
    burst flagging, the thresholded one-level variant): a (entity, day) is a
    burst when the day's mention count is at least ``factor_pm/1000`` times
    the entity's trailing ``window_days``-day DAILY AVERAGE — or when the
    entity is brand new (no trailing history at all) and still clears
    ``min_count``.  The KG product surface behind "what is suddenly being
    talked about": emerging entities, news spikes, vandalism floods.

    Integer discipline: the ratio test is cross-multiplied —
    ``n·window_days·1000 ≥ factor_pm·trailing_sum`` — so no float division
    exists; gaps in the timeline count as zero history because the trailing
    frame is a RANGE frame over the integer day (both engines skip absent
    days identically).

    100 TB shape: ONE map-side-combinable groupBy to (entity, day) counts
    (days-per-entity-sized, orders below mentions), then a PARTITIONED
    window per entity ordered by day — bounded by an entity's distinct days,
    never global.  No python, no collect.
    """
    daily = mentions.groupBy(
        F.col(entity_col).alias("entity"), F.col(day_col).alias("day")
    ).agg(F.count(F.lit(1)).cast("long").alias("n_mentions"))
    w = (
        Window.partitionBy("entity")
        .orderBy(F.col("day").cast("long"))
        .rangeBetween(-window_days, -1)
    )
    trailing = F.coalesce(F.sum("n_mentions").over(w), F.lit(0)).cast("long")
    out = daily.select(
        "entity", "day", "n_mentions", trailing.alias("trailing_sum")
    )
    n, t = F.col("n_mentions"), F.col("trailing_sum")
    is_burst = (n >= min_count) & (
        (t == 0) | (n * window_days * 1000 >= F.lit(factor_pm) * t)
    )
    return out.select(
        "entity",
        "day",
        "n_mentions",
        "trailing_sum",
        is_burst.cast("int").alias("is_burst_i"),
    )


def entity_timeline(
    dated: DataFrame,
    subj_col: str = "subj",
) -> DataFrame:
    """KG biography assembly — one row per entity with its dated facts in
    chronological order: ``(subj, n_events, first_year, last_year,
    timeline)`` where timeline renders each DISTINCT qualified fact as
    ``"<year> <qualifier> <pred> <obj>"`` joined by ``" | "``, ordered by
    (year, pred, obj, qualifier) — a total order, so the string is
    engine-reproducible.  The entity-card product surface behind "show me
    the history of X"; consumes :func:`extract_dated_facts` output (or any
    frame with pred/obj/qualifier/year).

    100 TB shape: distinct on the qualified fact, then ONE subject-keyed
    groupBy whose payload is that entity's facts (bounded by biography
    length, not corpus size) — sorted-struct array expressions, no window,
    no python; co-partitions with every other subj-keyed KG op.
    """
    facts = dated.select(
        F.col(subj_col).alias("subj"), "pred", "obj", "qualifier", "year"
    ).distinct()
    g = facts.groupBy("subj").agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.min("year").cast("int").alias("first_year"),
        F.max("year").cast("int").alias("last_year"),
        F.array_sort(
            F.collect_list(F.struct("year", "pred", "obj", "qualifier"))
        ).alias("_ev"),
    )
    rendered = F.array_join(
        F.transform(
            F.col("_ev"),
            lambda e: F.concat_ws(
                " ",
                e["year"].cast("string"),
                e["qualifier"],
                e["pred"],
                e["obj"],
            ),
        ),
        " | ",
    )
    return g.select(
        "subj", "n_events", "first_year", "last_year", rendered.alias("timeline")
    )


def fact_confidence(
    observed: DataFrame,
    host_col: str = "host",
    subj_col: str = "subj",
    pred_col: str = "pred",
    obj_col: str = "obj",
) -> DataFrame:
    """Reliability-weighted fact confidence — the second half-iteration of
    the truth-discovery loop :func:`source_reliability` starts: each host's
    reliability (majority-agreement share) feeds back as that host's VOTE
    WEIGHT, so a fact asserted by two trustworthy hosts outranks one spammed
    by a single unreliable mirror farm.

    Output per DISTINCT (subj, pred, obj): ``n_hosts`` (distinct asserting
    hosts), ``support_i`` = Σ reliability_i over those hosts (BIGINT sum of
    scaled ints — exact), and ``confidence_pm`` = 1000·support_i div
    (1e6·n_hosts) — the reliability-weighted share in [0, 1000].  One vote
    per (host, fact): re-crawls of the same page don't stuff the ballot.

    100 TB shape: reliability is a |hosts|-sized table — broadcast onto the
    DISTINCT (host, fact) votes; the per-fact rollup map-side combines and
    co-partitions with every other fact-keyed op.
    """
    rel = source_reliability(
        observed, host_col, subj_col, pred_col, obj_col
    ).select("host", "reliability_i")
    votes = observed.select(
        F.col(host_col).alias("host"),
        F.col(subj_col).alias("subj"),
        F.col(pred_col).alias("pred"),
        F.col(obj_col).alias("obj"),
    ).distinct()
    return (
        votes.join(F.broadcast(rel), "host")
        .groupBy("subj", "pred", "obj")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_hosts"),
            F.sum("reliability_i").cast("long").alias("support_i"),
        )
        .select(
            "subj",
            "pred",
            "obj",
            "n_hosts",
            "support_i",
            F.expr("1000 * support_i div (1000000 * n_hosts)")
            .cast("long")
            .alias("confidence_pm"),
        )
    )


def allen_relations(
    intervals: DataFrame,
    subj_col: str = "subj",
    id_col: str = "fid",
    start_col: str = "s",
    end_col: str = "e",
    max_group: int | None = None,
) -> DataFrame:
    """Allen's interval algebra (Allen 1983) over per-subject validity
    intervals: for every ordered pair of a subject's intervals (id_a < id_b)
    emit which of the 13 basic relations interval A bears to interval B —
    the temporal-consistency primitive behind conflict detection on dated
    facts (two reigns that `overlaps` each other, an acquisition `during` a
    bankruptcy, …).

    Intervals must be strict (start < end); violators are dropped.  The 13
    relations are encoded as mutually-exclusive COMPLETE conditions (no
    CASE fall-through dependence), so any evaluation order — including a
    SQL twin's — yields identical labels.

    Scale shape: ONE self-join keyed on the subject (hash-partitioned by
    entity), quadratic only within a subject's own interval set.  For
    head-entity skew pass ``max_group``: subjects with more intervals are
    dropped wholesale (the stop-fact df-cap precedent) rather than silently
    exploding the pair space."""
    iv = (
        intervals.select(
            F.col(subj_col).alias("subj"),
            F.col(id_col).alias("fid"),
            F.col(start_col).cast("long").alias("s"),
            F.col(end_col).cast("long").alias("e"),
        )
        .filter(F.col("s") < F.col("e"))
    )
    if max_group is not None:
        # anti-join against the (small) over-cap set — the KEEP side is
        # nearly the whole subject universe and must never be broadcast
        # (the _overlap_pairs hub-cap discipline)
        sizes = iv.groupBy("subj").agg(F.count(F.lit(1)).alias("n_iv"))
        iv = iv.join(
            sizes.filter(F.col("n_iv") > max_group), "subj", "left_anti"
        )
    a = iv.select("subj", F.col("fid").alias("fid_a"), F.col("s").alias("s1"), F.col("e").alias("e1"))
    b = iv.select("subj", F.col("fid").alias("fid_b"), F.col("s").alias("s2"), F.col("e").alias("e2"))
    p = a.join(b, "subj").filter(F.col("fid_a") < F.col("fid_b"))
    s1, e1, s2, e2 = F.col("s1"), F.col("e1"), F.col("s2"), F.col("e2")
    rel = (
        F.when((s1 == s2) & (e1 == e2), F.lit("equals"))
        .when(e1 < s2, F.lit("before"))
        .when(s1 > e2, F.lit("after"))
        .when(e1 == s2, F.lit("meets"))
        .when(s1 == e2, F.lit("met_by"))
        .when((s1 == s2) & (e1 < e2), F.lit("starts"))
        .when((s1 == s2) & (e1 > e2), F.lit("started_by"))
        .when((e1 == e2) & (s1 > s2), F.lit("finishes"))
        .when((e1 == e2) & (s1 < s2), F.lit("finished_by"))
        .when((s1 > s2) & (e1 < e2), F.lit("during"))
        .when((s1 < s2) & (e1 > e2), F.lit("contains"))
        .when((s1 < s2) & (s2 < e1) & (e1 < e2), F.lit("overlaps"))
        .when((s2 < s1) & (s1 < e2) & (e2 < e1), F.lit("overlapped_by"))
        # exhaustive for strict intervals — a NULL here would mean the
        # algebra above has a hole, and the oracle's identical ELSE NULL
        # would surface it as a hash mismatch
    )
    return p.select("subj", "fid_a", "fid_b", rel.alias("rel"))


def scd2_apply(
    store: DataFrame,
    changes: DataFrame,
    key_cols: Sequence[str] = ("subj", "pred"),
    val_col: str = "obj",
    ts_col: str = "ts",
    from_col: str = "valid_from",
    to_col: str = "valid_to",
) -> DataFrame:
    """Slowly-changing-dimension type-2 merge: apply a change batch to a
    versioned fact store and return the NEW store — the maintenance step
    that turns per-crawl observations into ``extract_dated_facts``-shaped
    interval history (valid_to NULL = the open/current version).

    Semantics (all pinned):
      * a change whose value equals the key's current open value is a no-op;
      * multiple changes to one key in one batch CHAIN versions in ts order
        (consecutive in-batch duplicates collapse);
      * the first effective change closes the prior open row at its ts;
      * STALE rows (ts <= the open version's valid_from) are rejected — the
        standard monotone-feed contract (late facts belong in a quarantine
        re-run, not spliced into closed history);
      * two changes to one key at the SAME ts tie-break by value (ts, then
        ``val_col`` — the same "pre-aggregate or it's order-dependent"
        caveat as asof_join: elect one value per (key, ts) upstream when
        the tie order is not the semantics you want; the EARLIER-sorted
        of two tied values becomes the zero-length version and the
        later-sorted one holds the open slot);
      * unseen keys pass through untouched; closed history is immutable.

    100 TB shape: every window runs over the BATCH (delta-sized, key-
    partitioned); the store participates in exactly two key joins —
    open-rows ⋈ batch-keys and open-rows ⋈ first-change — and with the
    store bucketed by key the closed partition never moves.  Nothing
    corpus-wide shuffles; cost is O(delta) + O(open-rows join).
    """
    key = list(key_cols)
    out_cols = [*key, val_col, from_col, to_col]
    closed = store.filter(F.col(to_col).isNotNull()).select(*out_cols)
    open_rows = store.filter(F.col(to_col).isNull())

    cur = open_rows.select(
        *key,
        F.col(val_col).alias("_cur"),
        F.col(from_col).alias("_cur_from"),
    )
    fresh = changes.join(cur, key, "left").filter(
        F.col("_cur_from").isNull() | (F.col(ts_col) > F.col("_cur_from"))
    )
    w_raw = Window.partitionBy(*key).orderBy(ts_col, val_col)
    seq = fresh.withColumn("_prev", F.lag(val_col).over(w_raw))
    eff = seq.filter(
        F.when(F.col("_prev").isNotNull(), F.col("_prev") != F.col(val_col)).otherwise(
            F.col("_cur").isNull() | (F.col("_cur") != F.col(val_col))
        )
    )
    w_eff = Window.partitionBy(*key).orderBy(ts_col, val_col)
    new_versions = eff.select(
        *key,
        F.col(val_col),
        F.col(ts_col).alias(from_col),
        F.lead(ts_col).over(w_eff).alias(to_col),
    )
    first_change = eff.groupBy(*key).agg(F.min(ts_col).alias("_first_ts"))
    open_updated = (
        open_rows.join(first_change, key, "left")
        .select(*key, val_col, from_col, F.col("_first_ts").alias(to_col))
    )
    return closed.unionByName(open_updated).unionByName(new_versions)


def event_transitions(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    id_col: str = "event_id",
) -> DataFrame:
    """(src_type, dst_type, n, p_mi) — first-order Markov transition matrix
    of event types along each user's timeline (the clickstream-analytics
    staple: "what follows a view?"; the row-normalized probabilities feed
    funnel analysis and next-event prediction baselines).

    Determinism: per-user order is (ts, id) — the unique id tie-break makes
    same-timestamp events order-stable in both engines; ``p_mi`` is the
    exact integer ``n·1e6 div row_total``.

    100 TB shape: ONE user-partitioned lead window (never global) + two
    map-side-combinable aggregates onto a |types|² key space; the |types|-
    row totals broadcast back.
    """
    w = Window.partitionBy(user_col).orderBy(ts_col, id_col)
    nxt = (
        events.select(user_col, ts_col, id_col, F.col(type_col).alias("src_type"))
        .withColumn("dst_type", F.lead("src_type").over(w))
        .filter(F.col("dst_type").isNotNull())
    )
    counts = nxt.groupBy("src_type", "dst_type").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    totals = counts.groupBy("src_type").agg(F.sum("n").cast("long").alias("_tot"))
    return counts.join(F.broadcast(totals), "src_type").select(
        "src_type",
        "dst_type",
        "n",
        F.expr("(n * 1000000) div _tot").cast("long").alias("p_mi"),
    )


def funnel_conversion(
    events: DataFrame,
    steps: list,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """(step_idx, step, users, conv_from_prev_mi, conv_from_first_mi) —
    strictly-ordered funnel: a user reaches step k only via the EARLIEST
    completion time of step k-1 followed by a later step-k event (the
    product-analytics semantics: Amplitude/Mixpanel "this order" funnels;
    reference has no funnel op — this is the web-analytics tier the
    events table exists for).

    Earliest-completion is the standard greedy rule: it maximizes the set
    of users counted at each step (any later step-(k-1) witness only
    shrinks the window for step k), so the greedy chain IS the funnel.

    Determinism: min(ts) per user/step is exact; conversion ratios are
    integer ``users_k·1e6 div users_{k-1}`` (div by the FIRST step for
    conv_from_first).

    100 TB shape: one filter to the |steps| event types, ONE user-keyed
    aggregate building |steps| sorted ts arrays (per-user activity sized),
    then the "earliest after previous" chain is a JVM array fold over ONE
    row per user — no self-joins, no window over the raw event stream.
    Final counts are a tiny |steps|-row frame.
    """
    if len(steps) < 2:
        raise ValueError("funnel needs >= 2 steps")
    # per-user sorted ts arrays, one per step (arrays are per-user activity
    # sized — clickstream scale; a heavy-user cap upstream is the skew
    # guard at 100 TB, same pattern as _overlap_pairs' max_fanout)
    arr_aggs = [
        F.sort_array(
            F.collect_list(F.when(F.col(type_col) == s, F.col(ts_col)))
        ).alias(f"_a{i}")
        for i, s in enumerate(steps)
    ]
    wide = (
        events.filter(F.col(type_col).isin(list(steps)))
        .groupBy(F.col(user_col).alias("user"))
        .agg(*arr_aggs)
    )
    # greedy earliest-completion chain: t_0 = first step-0 event; t_k =
    # EARLIEST step-k event strictly after t_{k-1} (null t_{k-1} makes the
    # filter lambda null → empty → null, so the chain collapses correctly).
    chained = wide
    for i in range(len(steps)):
        if i == 0:
            c = F.array_min(F.col("_a0"))  # sorted, so min = first; NULL-safe on empty
        else:
            prev = F.col(f"_t{i-1}")
            c = F.array_min(F.filter(F.col(f"_a{i}"), lambda x: x > prev))
        chained = chained.withColumn(f"_t{i}", c)
    chained = chained.select(*[f"_t{i}" for i in range(len(steps))])
    aggs = [
        F.count(F.col(f"_t{i}")).cast("long").alias(f"u{i}")
        for i in range(len(steps))
    ]
    counts = chained.agg(*aggs)
    rows = []
    for i, s in enumerate(steps):
        prev_u = F.col(f"u{i-1}") if i else F.col("u0")
        first_u = F.col("u0")
        rows.append(
            F.struct(
                F.lit(i).cast("long").alias("step_idx"),
                F.lit(s).alias("step"),
                F.col(f"u{i}").alias("users"),
                F.when(prev_u > 0, F.expr(f"(u{i} * 1000000) div u{max(i-1,0)}"))
                .otherwise(F.lit(None))
                .cast("long")
                .alias("conv_from_prev_mi"),
                F.when(first_u > 0, F.expr(f"(u{i} * 1000000) div u0"))
                .otherwise(F.lit(None))
                .cast("long")
                .alias("conv_from_first_mi"),
            )
        )
    return counts.select(F.explode(F.array(*rows)).alias("r")).select("r.*")


def retention_cohorts(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    max_offset: int = 4,
) -> DataFrame:
    """(cohort_week, week_offset, active_users, retained_mi) — classic
    weekly retention triangle: cohort = ISO week of the user's FIRST
    event; a user is active at offset k if they have any event whose
    week-start is exactly k weeks after the cohort week-start.

    Week buckets are date_trunc('week', ts) — both engines truncate to
    the Monday of the ISO week, so bucket labels match exactly; offsets
    are integer day-diffs div 7 (exact).  retained_mi = active·1e6 div
    cohort_size.

    100 TB shape: one (user)-keyed min-ts aggregate for the cohort map
    (broadcastable: |users| << |events| but if not, it's a shuffle on
    user_id that the activity agg below REUSES — same key), one
    (user, week) distinct, then a join on user_id and a tiny
    (cohort_week × offset) rollup.
    """
    firsts = events.groupBy(F.col(user_col).alias("user")).agg(
        F.date_trunc("week", F.min(ts_col)).cast("date").alias("cohort_week")
    )
    active = events.select(
        F.col(user_col).alias("user"),
        F.date_trunc("week", F.col(ts_col)).cast("date").alias("active_week"),
    ).distinct()
    joined = active.join(firsts, "user").withColumn(
        "week_offset",
        (F.datediff("active_week", "cohort_week") / 7).cast("long"),
    )
    cells = (
        joined.filter(F.col("week_offset") <= max_offset)
        .groupBy("cohort_week", "week_offset")
        .agg(F.countDistinct("user").cast("long").alias("active_users"))
    )
    sizes = firsts.groupBy("cohort_week").agg(
        F.count(F.lit(1)).cast("long").alias("_size")
    )
    return cells.join(F.broadcast(sizes), "cohort_week").select(
        F.col("cohort_week").cast("string").alias("cohort_week"),
        "week_offset",
        "active_users",
        F.expr("(active_users * 1000000) div _size").cast("long").alias("retained_mi"),
    )


def conversion_attribution(
    events: DataFrame,
    conversion_type: str = "purchase",
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    id_col: str = "event_id",
    window_days: int = 7,
) -> DataFrame:
    """(channel, last_touch, first_touch) — multi-touch attribution over
    each user's event stream: for every conversion event, credit the
    LAST non-conversion event strictly before it within ``window_days``
    (last-touch), and independently the FIRST touch inside that same
    lookback window (first-touch).  Channels here are event types (the
    synthetic stream has no utm columns; the operator takes any
    ``type_col``).

    Determinism: touches order by (ts, event_id) — the unique id breaks
    same-timestamp ties identically in both engines; conversions with no
    in-window touch are credited to '(none)' so totals reconcile with
    the conversion count.

    100 TB shape: ONE user-partitioned sort feeds both window functions
    (last_value and a min_by over the running frame is expressed as a
    self-join-free last/first over the per-user ordered frame); the wide
    per-conversion frame collapses immediately to a |channels|² rollup.
    """
    typed = events.select(
        F.col(user_col).alias("user"),
        F.col(ts_col).alias("ts"),
        F.col(id_col).alias("eid"),
        F.col(type_col).alias("etype"),
    )
    conv = typed.filter(F.col("etype") == conversion_type).select(
        "user", F.col("ts").alias("conv_ts"), F.col("eid").alias("conv_id")
    )
    touch = typed.filter(F.col("etype") != conversion_type)
    # range-join conversions to in-window preceding touches; per-user
    # event counts are small (clickstream sessions), and the join key is
    # user_id so it co-partitions with everything else in this family.
    j = conv.join(touch, "user").filter(
        (F.col("ts") < F.col("conv_ts"))
        & (F.col("ts") >= F.expr(f"conv_ts - INTERVAL {window_days} DAYS"))
    )
    picked = j.groupBy("user", "conv_ts", "conv_id").agg(
        F.max(F.struct("ts", "eid", "etype")).getField("etype").alias("last_touch"),
        F.min(F.struct("ts", "eid", "etype")).getField("etype").alias("first_touch"),
    )
    credited = conv.join(picked, ["user", "conv_ts", "conv_id"], "left").select(
        F.coalesce("last_touch", F.lit("(none)")).alias("last_touch"),
        F.coalesce("first_touch", F.lit("(none)")).alias("first_touch"),
    )
    return credited.groupBy("last_touch", "first_touch").agg(
        F.count(F.lit(1)).cast("long").alias("conversions")
    )


def sequential_pattern_support(
    events: DataFrame,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    min_support: int = 5,
    scale: int = 1_000_000,
) -> DataFrame:
    """2-step sequential-pattern support (the AprioriAll/PrefixSpan base
    case, Agrawal/Srikant '95): for ordered event types (a → b), the number
    of users whose timeline contains SOME a strictly before SOME b — the
    gap may contain anything (subsequence, not adjacency; adjacency is the
    Markov-transition surface, event_markov_transitions).

    "Some a before some b" needs no pairwise scan: per (user, type) only
    ``min(ts)`` and ``max(ts)`` matter — user supports a→b iff
    min_ts(a) < max_ts(b).  So the corpus collapses to one (user, type)
    aggregate and the pattern join runs on user-type summaries, never raw
    events; a ≠ b pairs only (a→a needs 2nd-smallest ts — out of contract,
    documented).

    Output: (antecedent, consequent, n_users, support_mi = n_users·scale
    div n_total_users) for pairs with n_users ≥ min_support."""
    # NULL users can never reach the pattern join (uid equi-join drops
    # them) so they must not deflate the denominator either; localCheckpoint
    # pins the (user,type) aggregate so the self-join sides and the total
    # read ONE computed frame, not three re-aggregations of the event scan
    g = (
        events.filter(F.col(user_col).isNotNull())
        .groupBy(F.col(user_col).alias("uid"), F.col(type_col).alias("etype"))
        .agg(
            F.min(F.col(ts_col)).alias("first_ts"),
            F.max(F.col(ts_col)).alias("last_ts"),
        )
        .localCheckpoint()
    )
    tot = g.agg(F.countDistinct("uid").cast("long").alias("n_total"))
    pairs = (
        g.alias("x")
        .join(g.alias("y"), "uid")
        .filter(
            (F.col("x.etype") != F.col("y.etype"))
            & (F.col("x.first_ts") < F.col("y.last_ts"))
        )
        .groupBy(
            F.col("x.etype").alias("antecedent"),
            F.col("y.etype").alias("consequent"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n_users"))
        .filter(F.col("n_users") >= min_support)
    )
    return pairs.crossJoin(F.broadcast(tot)).select(
        "antecedent",
        "consequent",
        "n_users",
        F.expr(f"CAST(({int(scale)} * n_users) div n_total AS BIGINT)").alias(
            "support_mi"
        ),
    )
