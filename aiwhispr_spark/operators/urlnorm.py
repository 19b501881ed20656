"""URL canonicalization + latest-crawl-per-url dedup — the first hygiene pass
of any Common-Crawl-style pipeline (the same page arrives as `HTTP://WWW.X.COM`,
`https://www.x.com/`, `…?utm_source=feed`, `…#section` across crawls).

The reference keys everything on raw content paths (`aiwhisprConstants.py`
suffix maps; no URL normalization exists) — at web scale un-normalized URLs
silently multiply every per-page operator, so this is first-class here.

All pure JVM expressions (regexp_extract / array ops — no python), mirrored
token-for-token by the DuckDB oracle in __spark_entry__.py.  Canonical form:

* scheme and host lowercased;
* default ports stripped (``:80`` for http, ``:443`` for https);
* fragment dropped;
* tracking params dropped (``utm_*``, ``fbclid``, ``gclid``, ``ref``),
  remaining params sorted bytewise, empty query dropped;
* trailing slashes stripped from the path.

100 TB shape: canonicalization is a narrow map (zero shuffle); the
latest-crawl dedup is ONE groupBy on the canonical url whose ``max_by``
partial-aggregates map-side, so the exchange carries one candidate row per
(canonical url, map partition) — not one per crawl snapshot.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_SCHEME_RE = r"^([A-Za-z][A-Za-z0-9+.\-]*)://"
TRACKING_PARAM_RE = r"^(utm_[^=&]*|fbclid|gclid|ref)(=|$)"

# Shared authority/path extraction — the ONE place URL splitting lives
# (linkgraph.host_of, sources/cdx SURT keys and robots.txt matching all
# build on these; keep any fix here so the operators cannot drift).
URL_HOST_RE = r"^[A-Za-z][A-Za-z0-9+.\-]*://([^/:?#]+)"
URL_PATH_RE = r"^[A-Za-z][A-Za-z0-9+.\-]*://[^/?#]+(/[^?#]*)?"


def url_host_expr(col: Column) -> Column:
    """Lowercased host (no port) of an absolute URL column ('' when the URL
    has no parseable authority)."""
    return F.lower(F.regexp_extract(col, URL_HOST_RE, 1))


def url_path_expr(col: Column) -> Column:
    """Path component (query/fragment stripped, case preserved, '/' when the
    URL has no path)."""
    raw = F.regexp_extract(col, URL_PATH_RE, 1)
    return F.when(raw == "", F.lit("/")).otherwise(raw)


def canonical_url_expr(col: Column) -> Column:
    """Canonical form of a URL column (see module docstring for the rules)."""
    scheme = F.lower(F.regexp_extract(col, _SCHEME_RE, 1))
    nofrag = F.regexp_extract(F.regexp_replace(col, _SCHEME_RE, ""), r"^([^#]*)", 1)
    hostport = F.lower(F.regexp_extract(nofrag, r"^([^/?]*)", 1))
    host = F.regexp_extract(hostport, r"^([^:]*)", 1)
    port = F.regexp_extract(hostport, r":(\d+)$", 1)
    pathq = F.regexp_extract(nofrag, r"^[^/?]*(.*)$", 1)
    path = F.regexp_replace(F.regexp_extract(pathq, r"^([^?]*)", 1), r"/+$", "")
    query = F.regexp_extract(pathq, r"\?(.*)$", 1)
    params = F.array_join(
        F.array_sort(
            F.filter(
                F.split(query, "&"),
                lambda p: (p != "") & ~p.rlike(TRACKING_PARAM_RE),
            )
        ),
        "&",
    )
    default_port = ((scheme == "http") & (port == "80")) | (
        (scheme == "https") & (port == "443")
    )
    portpart = F.when(
        (port != "") & ~default_port, F.concat(F.lit(":"), port)
    ).otherwise(F.lit(""))
    querypart = F.when(params != "", F.concat(F.lit("?"), params)).otherwise(
        F.lit("")
    )
    return F.concat(scheme, F.lit("://"), host, portpart, path, querypart)


def latest_crawl_per_url(
    df: DataFrame,
    url_col: str = "url",
    ts_col: str = "warc_ts",
    canon_col: str = "canon_url",
) -> DataFrame:
    """One row per canonical URL: the snapshot with the greatest ``ts_col``
    (ties broken by greatest raw ``url_col`` so the result is deterministic).
    All original columns survive; ``canon_col`` is added."""
    canon = df.withColumn(canon_col, canonical_url_expr(F.col(url_col)))
    others = [c for c in canon.columns if c != canon_col]
    picked = canon.groupBy(canon_col).agg(
        F.max(F.struct(F.col(ts_col), F.col(url_col), *[F.col(c) for c in others if c not in (ts_col, url_col)])).alias("_best")
    )
    return picked.select(
        canon_col, *[F.col(f"_best.{c}").alias(c) for c in [ts_col, url_col] + [c for c in others if c not in (ts_col, url_col)]]
    ).select(*others, canon_col)


def host_suffixes(host: Column) -> Column:
    """All dot-suffixes of a hostname: 'ads.x.org' → ['ads.x.org', 'x.org',
    'org'] — the matching unit for domain blocklists (blocking 'x.org' must
    block every subdomain)."""
    labels = F.split(host, r"\.")
    n = F.size(labels)
    return F.transform(
        F.sequence(F.lit(0), n - 1),
        lambda i: F.array_join(F.slice(labels, i + 1, n - i), "."),
    )


def filter_blocked_hosts(
    df: DataFrame, blocklist: DataFrame, url_col: str = "url"
) -> DataFrame:
    """Rows whose url's canonical host matches NO blocklist entry (exact or
    as a dot-suffix — 'example.org' in the list blocks 'ads.example.org').
    ``blocklist`` is a 1-column frame of blocked domains.

    The crawl-hygiene twin of the reference's do-not-read path filter (F1,
    `aiwhisprConstants.py` exclusion lists are path-based); at web scale the
    unit of exclusion is the domain.

    100 TB shape: blocking is a pure function of the url, so the match runs
    on a NARROW (url, suffix) projection — the document payload never rides
    a join.  The suffix⇄blocklist semi-join broadcasts any realistic
    blocklist; the final anti-join's right side is the (tiny) blocked-url
    set, which AQE also broadcasts — the corpus itself never shuffles."""
    from aiwhispr_spark.operators.linkgraph import host_of

    bl = blocklist.select(F.col(blocklist.columns[0]).alias("_blocked"))
    host = host_of(canonical_url_expr(F.col(url_col)))
    blocked_urls = (
        df.select(F.col(url_col).alias("_u"), F.explode(host_suffixes(host)).alias("_suf"))
        .join(F.broadcast(bl), F.col("_suf") == F.col("_blocked"), "left_semi")
        .select("_u")
    )
    return df.join(
        blocked_urls, df[url_col] == blocked_urls["_u"], "left_anti"
    )


def crawl_change_stats(
    df: DataFrame,
    url_col: str = "url",
    ts_col: str = "warc_ts",
    content_col: str = "html",
) -> DataFrame:
    """Re-crawl change detection per canonical URL — the signal a crawl
    scheduler uses to set re-fetch frequency (stable pages refetch rarely;
    churning pages often).

    Output per canonical url: ``n_snapshots``, ``n_versions`` (distinct
    content digests), ``n_changes`` (adjacent-snapshot pairs, ordered by
    ``ts_col`` with ``url_col`` as tie-break, whose digests differ — revert
    churn A→B→A counts 2 changes but only 2 versions), and ``first_ts`` /
    ``last_ts``.

    100 TB shape: ONE exchange on the canonical url; per-group work is a
    sort of that page's snapshot digests (bounded by snapshots-per-page,
    not corpus size) via sorted-struct array expressions — no window, no
    python."""
    canon = df.select(
        canonical_url_expr(F.col(url_col)).alias("canon_url"),
        F.col(ts_col).alias("_ts"),
        F.col(url_col).alias("_u"),
        F.md5(F.col(content_col)).alias("_dg"),
    )
    g = canon.groupBy("canon_url").agg(
        F.count(F.lit(1)).cast("long").alias("n_snapshots"),
        F.array_sort(
            F.collect_list(F.struct(F.col("_ts"), F.col("_u"), F.col("_dg")))
        ).alias("_snaps"),
        F.min("_ts").alias("first_ts"),
        F.max("_ts").alias("last_ts"),
    )
    digests = F.transform(F.col("_snaps"), lambda s: s["_dg"])
    changes = F.size(
        F.filter(
            F.zip_with(
                F.slice(digests, 1, F.size(digests) - 1),
                F.slice(digests, 2, F.size(digests) - 1),
                lambda a, b: a != b,
            ),
            lambda x: x,
        )
    )
    return g.select(
        "canon_url",
        "n_snapshots",
        F.size(F.array_distinct(digests)).cast("long").alias("n_versions"),
        changes.cast("long").alias("n_changes"),
        "first_ts",
        "last_ts",
    )


def crawl_schedule_priority(
    change_stats: DataFrame,
    host_rank: DataFrame,
    top_k: int = 30,
) -> DataFrame:
    """Re-crawl scheduling: rank pages by ``authority × churn`` — the two
    signals a crawler budget allocator combines (fetch important pages that
    actually change; skip stable or unimportant ones).

    ``change_stats`` is :func:`crawl_change_stats` output; ``host_rank`` is a
    (node, pr_i) frame from operators/graph.py::pagerank over the host graph
    (scaled-int pr).  priority_i = pr_i(host) · (n_changes + 1), integer
    math throughout; top_k with canon_url tie-break.

    100 TB shape: the host-rank table is |hosts|-sized (orders of magnitude
    below pages) — AQE broadcasts it onto the page-level stats; the top-k is
    TakeOrderedAndProject, never a global sort."""
    from .linkgraph import host_of

    pages = change_stats.withColumn("host", host_of(F.col("canon_url")))
    joined = pages.join(
        host_rank.withColumnRenamed("node", "host"), "host"
    )
    return (
        joined.select(
            "canon_url",
            (F.col("pr_i") * (F.col("n_changes") + F.lit(1))).alias("priority_i"),
        )
        .orderBy(F.desc("priority_i"), F.asc("canon_url"))
        .limit(top_k)
    )


def path_template_expr(path: Column) -> Column:
    """URL-path TEMPLATE: each ``/``-segment is replaced by a placeholder
    when it is id-like, so ``/item/4711`` and ``/item/9`` collapse to the
    same ``/item/{n}`` key.  Documented segment subset (first match wins):

    * digits only                  → ``{n}``
    * hex only, length ≥ 8         → ``{hex}`` (content digests, uuids
      without dashes; checked after digits so ``12345678`` stays ``{n}``)
    * contains a digit             → ``{mixed}`` (dates, slugs-with-ids)
    * otherwise                    → the segment lowercased

    Pure JVM split/transform/join (Java≡RE2-common character classes only),
    mirrored token-for-token by the DuckDB oracle.
    """
    segs = F.split(path, "/")
    templ = F.transform(
        segs,
        lambda s: F.when(s.rlike(r"^[0-9]+$"), F.lit("{n}"))
        .when(s.rlike(r"^[0-9a-fA-F]{8,}$"), F.lit("{hex}"))
        .when(s.rlike(r"[0-9]"), F.lit("{mixed}"))
        .otherwise(F.lower(s)),
    )
    return F.array_join(templ, "/")


def mine_url_templates(
    df: DataFrame,
    url_col: str = "url",
    trap_min_paths: int = 100,
) -> DataFrame:
    """URL-template induction + crawler-trap detection: group a frontier (or
    crawl log) by ``(host, path template)`` and flag parametric templates
    that expand into pathologically many distinct paths — the calendar /
    session-id / faceted-search trap signature every production crawler
    guards against (infinite URL spaces under one route).  The reference
    reads local files and never meets this; it is first-class crawl hygiene
    at web scale.

    Output per (host, template): ``n_urls`` (rows seen), ``n_paths``
    (distinct concrete paths), ``is_trap_i`` = 1 when the template contains
    a placeholder AND ``n_paths >= trap_min_paths`` (a static page re-crawled
    a million times is not a trap; a route with a million expansions is).

    100 TB shape: host/template are pure narrow expressions over the url;
    the single groupBy is map-side combinable on a key space of routes
    (orders of magnitude below URLs), and the payload is the url's md5 (for
    the distinct-path count), never the page. Zero python, one exchange.
    """
    keyed = df.select(
        url_host_expr(F.col(url_col)).alias("host"),
        path_template_expr(url_path_expr(F.col(url_col))).alias("template"),
        url_path_expr(F.col(url_col)).alias("_path"),
    )
    out = keyed.groupBy("host", "template").agg(
        F.count(F.lit(1)).cast("long").alias("n_urls"),
        F.countDistinct("_path").cast("long").alias("n_paths"),
    )
    return out.select(
        "host",
        "template",
        "n_urls",
        "n_paths",
        (
            F.col("template").contains("{")
            & (F.col("n_paths") >= F.lit(trap_min_paths))
        )
        .cast("int")
        .alias("is_trap_i"),
    )


# two-level public suffixes, documented reduced subset of the PSL (the
# entries that actually dominate web corpora; the full list is a config
# swap, not a code change)
TWO_LEVEL_SUFFIXES = (
    "co.uk ac.uk gov.uk org.uk co.jp ne.jp or.jp com.au net.au org.au "
    "com.br com.cn com.mx co.in co.kr com.tr com.ar co.za com.sg"
).split()


def registrable_domain_expr(host: Column) -> Column:
    """Registrable domain (eTLD+1) of a hostname under the documented
    two-level-suffix subset: 'news.bbc.co.uk' → 'bbc.co.uk',
    'ads.x.org' → 'x.org', bare 'localhost' stays itself.  The unit of
    ownership for blocking, rate limits and per-site dedup — hosts are too
    fine (every subdomain separate), suffixes too coarse.

    Pure JVM split/slice expressions, oracle-mirrored.
    """
    labels = F.split(host, r"\.")
    n = F.size(labels)
    # guard: slice start must be >= 1 (single-label hosts)
    last2 = F.when(
        n >= 2, F.array_join(F.slice(labels, n - 1, 2), ".")
    ).otherwise(host)
    two_level = last2.isin(*TWO_LEVEL_SUFFIXES)
    take = F.when(two_level & (n >= 3), 3).when(~two_level & (n >= 2), 2).otherwise(n)
    return F.array_join(F.slice(labels, n - take + 1, take), ".")


def domain_rollup(
    df: DataFrame,
    url_col: str = "url",
) -> DataFrame:
    """Per-registrable-domain crawl inventory: page rows, distinct hosts,
    distinct canonical urls — the ownership-level table a budget allocator,
    blocklist reviewer or per-site dedup keys on.

    100 TB shape: domain extraction is narrow; ONE map-side-combinable
    groupBy onto |domains| keys; the distinct-url count carries md5 digests,
    never pages.
    """
    keyed = df.select(
        registrable_domain_expr(url_host_expr(F.col(url_col))).alias("domain"),
        url_host_expr(F.col(url_col)).alias("_host"),
        canonical_url_expr(F.col(url_col)).alias("_canon"),
    )
    return keyed.groupBy("domain").agg(
        F.count(F.lit(1)).cast("long").alias("n_pages"),
        F.countDistinct("_host").cast("long").alias("n_hosts"),
        F.countDistinct("_canon").cast("long").alias("n_urls"),
    )


def snapshot_line_diff(
    df: DataFrame,
    url_col: str = "url",
    ts_col: str = "warc_ts",
    text_col: str = "text",
) -> DataFrame:
    """Line-level diff between the FIRST and LAST crawl snapshot of every
    canonical URL — what actually changed across the crawl window, where
    :func:`crawl_change_stats` only says *whether* it changed.  Lines are
    trimmed, empties dropped, and compared as DISTINCT sets (the CCNet
    line-unit convention), so reshuffled boilerplate isn't "change".

    Output per canonical url: ``n_snapshots``, ``n_old_lines`` /
    ``n_new_lines`` (distinct line counts of the two endpoint snapshots),
    ``n_added`` / ``n_removed`` (set differences new−old / old−new) and
    ``n_common``.  Snapshot endpoints are elected by (ts, text) struct
    min/max — the text tie-break makes duplicate-timestamp inputs
    deterministic.

    100 TB shape: ONE exchange keyed on the canonical url (map-side
    combinable min/max structs — the full snapshot history is never
    collected), then pure JVM split/array set ops on the two endpoint
    texts.  No window, no python, no explode."""
    canon = df.select(
        canonical_url_expr(F.col(url_col)).alias("canon_url"),
        # NULL text = empty line set: coalesce BEFORE the struct min/max,
        # else a NULL field wins the election and every downstream
        # split/size count goes NULL for that url
        F.struct(
            F.col(ts_col).alias("ts"),
            F.coalesce(F.col(text_col), F.lit("")).alias("text"),
        ).alias("_s"),
    )
    g = canon.groupBy("canon_url").agg(
        F.count(F.lit(1)).cast("long").alias("n_snapshots"),
        F.min("_s").alias("_first"),
        F.max("_s").alias("_last"),
    )

    def lines(c):
        return F.array_distinct(
            F.filter(
                F.transform(F.split(c, "\n"), lambda x: F.trim(x)),
                lambda x: x != "",
            )
        )

    old = lines(F.col("_first")["text"])
    new = lines(F.col("_last")["text"])
    return g.select(
        "canon_url",
        "n_snapshots",
        F.size(old).cast("long").alias("n_old_lines"),
        F.size(new).cast("long").alias("n_new_lines"),
        F.size(F.array_except(new, old)).cast("long").alias("n_added"),
        F.size(F.array_except(old, new)).cast("long").alias("n_removed"),
        F.size(F.array_intersect(old, new)).cast("long").alias("n_common"),
    )


_MOBILE_LABEL_RE = r"^([a-z][a-z0-9+.\-]*://)(?:(?:m|www|mobile|amp)\.)+"
_AMP_PARAM_RE = r"^(amp(=|$)|outputType=amp$)"


def mobile_variant_key_expr(col: Column) -> Column:
    """Variant-collapsing key of a URL column: :func:`canonical_url_expr`
    plus the mobile/AMP conventions — leading ``m.``/``www.``/``mobile.``/
    ``amp.`` host labels stripped, a trailing ``/amp`` path segment
    removed, and ``amp``/``amp=…``/``outputType=amp`` query params dropped
    (documented subset of the AMP URL zoo).  Two renderings of the same
    article collapse to one key."""
    base = canonical_url_expr(col)
    nohost = F.regexp_replace(base, _MOBILE_LABEL_RE, r"$1")
    noamp = F.regexp_replace(
        F.regexp_extract(nohost, r"^([^?]*)", 1), r"/amp$", ""
    )
    query = F.regexp_extract(nohost, r"\?(.*)$", 1)
    params = F.array_join(
        F.filter(
            F.split(query, "&"),
            lambda p: (p != "") & ~p.rlike(_AMP_PARAM_RE),
        ),
        "&",
    )
    return F.concat(
        noamp,
        F.when(params != "", F.concat(F.lit("?"), params)).otherwise(F.lit("")),
    )


def mobile_variant_clusters(df: DataFrame, url_col: str = "url") -> DataFrame:
    """Cluster a URL set by :func:`mobile_variant_key_expr` and elect the
    DESKTOP rendering as the cluster canonical (the non-variant URL —
    key == its own canonical form — wins; lexicographic min breaks ties and
    covers clusters that only ever appeared as variants).  Output per
    cluster: (variant_key, n_urls, n_variant, canonical_url).

    The m./AMP sibling of rel=canonical clustering: at crawl scale every
    mobile mirror doubles a page's operator cost unless collapsed here.

    100 TB shape: key + variant flag are a narrow JVM projection; ONE
    exchange on the key with map-side-combinable count/min-struct
    aggregates."""
    canon = canonical_url_expr(F.col(url_col))
    key = mobile_variant_key_expr(F.col(url_col))
    rows = df.select(
        key.alias("variant_key"),
        canon.alias("_canon"),
        (key != canon).cast("int").alias("_is_variant"),
    ).distinct()
    return rows.groupBy("variant_key").agg(
        F.count(F.lit(1)).cast("long").alias("n_urls"),
        F.sum("_is_variant").cast("long").alias("n_variant"),
        F.min(F.struct(F.col("_is_variant"), F.col("_canon")))["_canon"].alias(
            "canonical_url"
        ),
    )
