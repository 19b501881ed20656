"""Meta-robots directive compliance for web corpora: pages whose authors
opted out of indexing (``<meta name="robots" content="noindex">``) must be
dropped before any downstream use — the crawl-hygiene rule every responsible
Common-Crawl-style pipeline applies first (the reference indexes only local
files and never needs it; this belongs to the web-curation tier the engine
adds).

Semantics
---------
* The directive tag is any ``<meta ...>`` whose ``name`` attribute is
  ``robots`` (case-insensitive, either attribute order, single/double/no
  quotes).
* ``noindex`` (as a token) or a bare ``none`` content value ⇒ the page is not
  indexable; ``nofollow``/``none`` ⇒ its outlinks must not feed the link
  graph (operators/linkgraph.py callers filter on ``nofollow_i`` before
  ``extract_links``).
* A ``noindex`` mention under any OTHER meta name (e.g. a description that
  quotes the word) is NOT a directive — the tag match keys on name=robots.

Regexes stay inside the Java≡RE2 common subset (no lookaround, no backrefs)
so the DuckDB oracle runs the byte-same patterns.

100 TB shape: pure JVM regexp expressions over the html column — zero
shuffle, zero Python; the filter composes with the scan and is pushed into
the same whole-stage-codegen span as the rest of the curation chain.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# full <meta ...> tag whose name attribute is robots, either attribute order
META_ROBOTS_TAG = r"(?is)<meta\b[^>]*\bname\s*=\s*[\"']?robots\b[^>]*>"
# content attribute value inside the matched tag
CONTENT_VALUE = r"(?is)\bcontent\s*=\s*[\"']?([^\"'>]*)"


def robots_contents_expr(html: Column) -> Column:
    """Content values of ALL meta-robots tags on the page (array, possibly
    empty).  Multiple robots metas are legal and their directives UNION —
    reading only the first tag would drop an author's noindex stated in a
    second tag."""
    tags = F.regexp_extract_all(html, F.lit(META_ROBOTS_TAG), F.lit(0))
    return F.transform(tags, lambda t: F.regexp_extract(t, CONTENT_VALUE, 1))


def meta_robots_flags(
    df: DataFrame, html_col: str = "html_text"
) -> DataFrame:
    """Add ``noindex_i`` / ``nofollow_i`` BIGINT flags derived from the page's
    meta-robots directives (0 when none present; directives from multiple
    robots tags union)."""
    cvals = robots_contents_expr(F.col(html_col))

    def _any(pattern: str) -> Column:
        return F.exists(
            cvals,
            lambda c: c.rlike(pattern) | (F.lower(F.trim(c)) == "none"),
        )

    noindex = _any(r"(?i)\bnoindex\b")
    nofollow = _any(r"(?i)\bnofollow\b")
    return df.withColumn("noindex_i", noindex.cast("long")).withColumn(
        "nofollow_i", nofollow.cast("long")
    )


def filter_indexable(df: DataFrame, html_col: str = "html_text") -> DataFrame:
    """Drop pages whose meta-robots directive forbids indexing."""
    flagged = meta_robots_flags(df, html_col)
    return flagged.where(F.col("noindex_i") == 0).drop(
        "noindex_i", "nofollow_i"
    )


# ---------------------------------------------------------------------------
# robots.txt rule engine (RFC 9309 subset)
# ---------------------------------------------------------------------------
# Group structure: consecutive User-agent lines open ONE group; the
# Allow/Disallow lines that follow belong to every agent named.  Agent
# selection is most-specific-only: if any group names the crawler's token,
# the '*' groups are ignored entirely (RFC 9309 §2.2.1).  Matching is
# longest-prefix over the URL path; on an equal-length Allow/Disallow tie the
# Allow wins (§2.2.2).  Unsupported (documented, rules dropped): '*'/'$'
# wildcards and percent-encoding equivalence.  Empty rule values match
# nothing (an empty Disallow means "no restriction" per the RFC examples).
#
# 100 TB shape: robots.txt files are tiny and one-per-host — every window
# below partitions by host, so state is bounded by a single file's line
# count; the rules table is |hosts|-sized and AQE broadcasts it onto the
# page-scale URL frame.  All parsing is JVM regex; zero python.

_DIRECTIVE_RE = r"(?i)^[ \t]*(user-agent|allow|disallow)[ \t]*:"
_VALUE_RE = r"(?i)^[ \t]*(?:user-agent|allow|disallow)[ \t]*:(.*)$"


def parse_robots_rules(
    robots: DataFrame,
    host_col: str = "host",
    robots_col: str = "robots_txt",
) -> DataFrame:
    """robots.txt text per host → (host, gid, agents array, rule, prefix,
    prefix_len).  One row per Allow/Disallow rule per group; a group with no
    rules keeps ONE row with NULL rule/prefix — it restricts nothing but
    still CLAIMS its agents (RFC 9309 §2.2.1: an empty specific-agent group
    means allow-all for that agent, NOT fall-through to the '*' group)."""
    from pyspark.sql import Window

    lines = robots.select(
        F.col(host_col).alias("host"),
        F.posexplode(F.split(F.col(robots_col), "\n")).alias("i", "ln"),
    )
    parsed = lines.select(
        "host",
        "i",
        F.lower(F.regexp_extract("ln", _DIRECTIVE_RE, 1)).alias("directive"),
        # value = text after ':', inline comment stripped, trimmed
        F.trim(
            F.regexp_replace(F.regexp_extract("ln", _VALUE_RE, 1), r"[ \t]*#.*$", "")
        ).alias("value"),
    ).where(F.col("directive") != "")

    w = Window.partitionBy("host").orderBy("i")
    grouped = parsed.withColumn(
        "is_ua", F.col("directive") == "user-agent"
    ).withColumn(
        "new_group",
        F.col("is_ua")
        & ~F.coalesce(F.lag("is_ua").over(w), F.lit(False)),
    ).withColumn(
        "gid",
        F.sum(F.col("new_group").cast("int")).over(
            w.rowsBetween(Window.unboundedPreceding, 0)
        ),
    ).where(F.col("gid") > 0)  # rules before any User-agent line are ignored

    agents = (
        grouped.where("is_ua")
        .groupBy("host", "gid")
        .agg(F.collect_set(F.lower(F.col("value"))).alias("agents"))
    )
    rules = (
        grouped.where(
            (~F.col("is_ua"))
            & (F.col("value") != "")
            & ~F.col("value").rlike(r"[*$]")  # wildcard rules unsupported
        )
        .select(
            "host",
            "gid",
            F.col("directive").alias("rule"),
            F.col("value").alias("prefix"),
            F.length("value").alias("prefix_len"),
        )
    )
    return agents.join(rules, ["host", "gid"], "left")


def apply_robots_rules(
    urls: DataFrame,
    rules: DataFrame,
    agent: str = "*",
    url_col: str = "url",
) -> DataFrame:
    """Per-URL fetch verdict under ``agent``: adds ``allowed_i`` (1/0) and
    ``match_prefix`` (the winning rule's path prefix, NULL when no rule
    matched).  Hosts with no applicable rules allow everything."""
    from aiwhispr_spark.operators.urlnorm import url_host_expr, url_path_expr

    agent_l = agent.lower()
    with_host = urls.withColumn(
        "__host", url_host_expr(F.col(url_col))
    ).withColumn("__path", url_path_expr(F.col(url_col)))

    # most-specific-only agent selection, computed over the tiny rules table
    sel = rules.withColumn(
        "applies_specific", F.array_contains("agents", agent_l)
    ).withColumn("applies_star", F.array_contains("agents", "*"))
    host_has = sel.groupBy("host").agg(
        F.max(F.col("applies_specific").cast("int")).alias("has_specific")
    )
    applicable = (
        sel.join(host_has, "host")
        .where(
            (F.col("has_specific") == 1) & F.col("applies_specific")
            | (F.col("has_specific") == 0) & F.col("applies_star")
        )
        .where(F.col("rule").isNotNull())  # empty-group markers restrict nothing
        .select("host", "rule", "prefix", "prefix_len")
    )

    hit = with_host.join(
        applicable,
        (with_host["__host"] == applicable["host"])
        & with_host["__path"].startswith(applicable["prefix"]),
        "left",
    )
    best = hit.groupBy(url_col).agg(
        F.max(
            F.when(
                F.col("prefix").isNotNull(),
                F.struct(
                    F.col("prefix_len").alias("l"),
                    (F.col("rule") == "allow").alias("is_allow"),
                    F.col("prefix").alias("p"),
                ),
            )
        ).alias("b")
    )
    out = urls.join(best, url_col, "left").select(
        urls["*"],
        F.when(F.col("b").isNull(), F.lit(1))
        .otherwise(F.col("b.is_allow").cast("int"))
        .alias("allowed_i"),
        F.col("b.p").alias("match_prefix"),
    )
    return out


def politeness_budget(
    frontier: DataFrame,
    k: int = 3,
    host_col: str = "host",
    priority_col: str = "priority_i",
    url_col: str = "url",
) -> DataFrame:
    """Per-host fetch budget: keep each host's top-``k`` frontier URLs by
    (priority DESC, url ASC) — the politeness cap every crawl scheduler
    applies after prioritization (a host may dominate the priority ranking,
    but a polite crawler still fetches at most k of its pages per cycle).

    One row_number window PARTITIONED BY HOST (never global) — at web scale
    hosts are the natural high-cardinality key, so partitions stay small;
    a pathological mega-host is exactly the case the cap bounds."""
    from pyspark.sql.window import Window

    w = Window.partitionBy(host_col).orderBy(
        F.desc(priority_col), F.asc(url_col)
    )
    return (
        frontier.withColumn("fetch_rank", F.row_number().over(w))
        .filter(F.col("fetch_rank") <= k)
        .withColumn("fetch_rank", F.col("fetch_rank").cast("int"))
    )


def sitemap_urls_from_robots(
    robots: DataFrame,
    host_col: str = "host",
    robots_col: str = "robots_txt",
) -> DataFrame:
    """``Sitemap:`` directive extraction — the missing first hop of the
    discovery chain (robots.txt → sitemap index → sitemaps → url frontier,
    now closed end-to-end with sources/sitemap.py): RFC 9309 treats the
    directive as group-INDEPENDENT, so every occurrence anywhere in the file
    counts, case-insensitively, with inline comments stripped.  Returns
    DISTINCT (host, sitemap_url).

    100 TB shape: robots files are tiny and per-host — one narrow line
    explode + regex; the distinct is host-keyed and |directives|-sized.
    """
    lines = robots.select(
        F.col(host_col).alias("host"),
        F.explode(F.split(F.col(robots_col), "\n")).alias("ln"),
    )
    is_sm = F.lower(F.regexp_extract("ln", r"^[ \t]*([A-Za-z-]+)[ \t]*:", 1)) == "sitemap"
    url = F.trim(
        F.regexp_replace(
            F.regexp_extract("ln", r"^[ \t]*[A-Za-z-]+[ \t]*:[ \t]*(.*)$", 1),
            r"[ \t]*#.*$",
            "",
        )
    )
    return (
        lines.select("host", F.when(is_sm, url).alias("sitemap_url"))
        .where(F.col("sitemap_url").isNotNull() & (F.col("sitemap_url") != ""))
        .distinct()
    )


def revalidation_plan(
    df,
    now_ep: int,
    url_col: str = "url",
    etag_col: str = "etag",
    lm_col: str = "lm_ep",
    ma_col: str = "max_age_s",
    fetched_col: str = "fetched_ep",
):
    """HTTP cache revalidation planner (RFC 7234-lite) — the recrawl-queue
    decision a polite fetcher makes per cached page:

    * ``fresh``            — explicit max-age not yet exceeded (no fetch);
    * ``fresh_heuristic``  — no max-age, but age < 10% of (fetched −
      Last-Modified), the §4.2.2 heuristic lifetime;
    * ``revalidate_etag``  — stale with a validator → conditional GET
      If-None-Match (a 304 costs headers, not bytes);
    * ``revalidate_lm``    — stale, Last-Modified only → If-Modified-Since;
    * ``refetch``          — no validator at all.

    All epoch-second BIGINT math (age·10 < lifetime cross-multiplied — no
    division); lifetime_s = −1 sentinel when no heuristic applies (visible,
    never NULL).  Pure JVM CASE chain, zero shuffle — runs at scan speed
    over the crawl-state table."""
    from pyspark.sql import functions as F

    age = (F.lit(int(now_ep)) - F.col(fetched_col)).cast("long")
    has_ma = F.col(ma_col).isNotNull()
    has_etag = F.col(etag_col).isNotNull()
    has_lm = F.col(lm_col).isNotNull()
    heur_life = (F.col(fetched_col) - F.col(lm_col)).cast("long")
    decision = (
        F.when(has_ma & (age < F.col(ma_col)), F.lit("fresh"))
        .when(~has_ma & has_lm & (age * 10 < heur_life), F.lit("fresh_heuristic"))
        .when(has_etag, F.lit("revalidate_etag"))
        .when(has_lm, F.lit("revalidate_lm"))
        .otherwise(F.lit("refetch"))
    )
    header = (
        F.when(decision == "revalidate_etag", F.lit("if-none-match"))
        .when(decision == "revalidate_lm", F.lit("if-modified-since"))
        .otherwise(F.lit(""))
    )
    return df.select(
        F.col(url_col).alias("url"),
        age.alias("age_s"),
        F.when(~has_ma & has_lm, heur_life).otherwise(F.lit(-1)).cast("long").alias(
            "lifetime_s"
        ),
        decision.alias("decision"),
        header.alias("cond_header"),
    )


def politeness_schedule(
    frontier,
    delay_s: int,
    host_col: str = "host",
    url_col: str = "url",
    arrival_col: str = "arrival_ep",
):
    """Per-host fetch-time assignment under a crawl delay — the politeness
    queue as DATA: within a host (arrival asc, url asc), fetch times obey
    ``t_i = max(arrival_i, t_{i-1} + delay)``.  That recurrence looks
    sequential, but unrolls to the CLOSED FORM

        t_i = i·delay + max_{j ≤ i}(arrival_j − j·delay)

    (induction in the docstring source), i.e. ONE host-partitioned running
    max — no applyInPandas, no per-row loop, exact integers end to end.

    Returns (host, url, arrival_ep, q_idx, fetch_ep, wait_s); wait_s ≥ 0
    always (a fetch never precedes its arrival).

    100 TB shape: one window partitioned by host (the politeness_budget
    discipline); per-host queue length bounds the frame, never the
    corpus."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    d = int(delay_s)
    base = frontier.select(
        F.col(host_col).alias("host"),
        F.col(url_col).alias("url"),
        F.col(arrival_col).cast("long").alias("arrival_ep"),
    ).withColumn("q_idx", (F.row_number().over(
        Window.partitionBy("host").orderBy(F.col("arrival_ep"), F.col("url"))
    ) - 1).cast("long"))
    run = Window.partitionBy("host").orderBy("q_idx").rowsBetween(
        Window.unboundedPreceding, 0
    )
    out = base.withColumn(
        "fetch_ep",
        (
            F.col("q_idx") * F.lit(d)
            + F.max(F.col("arrival_ep") - F.col("q_idx") * F.lit(d)).over(run)
        ).cast("long"),
    )
    return out.select(
        "host", "url", "arrival_ep", "q_idx", "fetch_ep",
        (F.col("fetch_ep") - F.col("arrival_ep")).cast("long").alias("wait_s"),
    )
