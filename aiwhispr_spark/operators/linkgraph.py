"""Web link graph: href extraction from raw HTML → URL resolution →
canonicalization (operators/urlnorm.py rules) → host-level edge aggregation,
feeding operators/graph.py::pagerank for host authority ranking.

The reference treats each document as an isolated blob (no notion of the
link structure BETWEEN pages); a crawl-scale KG wants the hyperlink graph as
a first-class edge set — for crawl prioritization, spam/host authority
priors on the entity linker, and domain-level curation stats.

Scale shape (100 TB of WARC):
* extraction + resolution + canonicalization are one narrow projection —
  pure JVM regex/array expressions over the page text, zero shuffle, no
  python stage;
* the page→page edge list is never materialized corpus-wide: host edges
  aggregate (src_host, dst_host) with a map-side-combinable count, so the
  only exchange carries one row per (host pair, map partition).  Host
  cardinality is ~10^7-10^8 for the full web — a small table next to the
  corpus;
* PageRank then runs on the aggregated host graph (|V| = hosts, not pages),
  which is the standard trick that makes web-graph authority tractable.

Resolution rules (documented subset of RFC 3986 — the crawl-hygiene cases):
absolute http(s) links pass through; root-relative ("/path") joins the
page's own scheme://host; mailto:/javascript:/tel:/data:, bare fragments,
empty hrefs, and doc-relative paths ("sub/page" — rare in crawl chrome and
base-href-dependent) are skipped.  Only double-quoted href attributes are
parsed (the writer side of every major CMS; single-quote support would be
one more regex alternative).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from aiwhispr_spark.operators.urlnorm import canonical_url_expr, url_host_expr

_HREF_RE = r'<a\s[^>]*href="([^"]*)"'
_ABS_RE = r"^[Hh][Tt][Tt][Pp][Ss]?://"


def host_of(url: Column) -> Column:
    """Lowercased host (no port) of an absolute URL column."""
    return url_host_expr(url)


def _resolve(href: Column, src_url: Column) -> Column:
    """The module's documented resolution/skip contract, shared by link and
    anchor extraction: absolute http(s) pass through; root-relative joins the
    page's own scheme://host (skipped when the src url itself has no
    parseable base — a scheme-less row must not mint ':///path' edges);
    everything else (mailto:/javascript:/fragments/doc-relative) is NULL."""
    base = F.regexp_extract(src_url, r"^([A-Za-z][A-Za-z0-9+.\-]*://[^/?#]*)", 1)
    return (
        F.when(href.rlike(_ABS_RE), href)
        .when(href.startswith("/") & (base != ""), F.concat(base, href))
        .otherwise(F.lit(None))
    )


def extract_links(
    docs: DataFrame, url_col: str = "url", html_col: str = "html"
) -> DataFrame:
    """(src_url, dst_url) — one row per kept, resolved, canonicalized
    out-link; duplicate links within a page survive (callers aggregate)."""
    text = F.decode(F.col(html_col), "UTF-8")
    return (
        docs.select(
            F.col(url_col).alias("src_url"),
            F.explode(
                F.regexp_extract_all(text, F.lit(_HREF_RE), F.lit(1))
            ).alias("href"),
        )
        .withColumn(
            "dst_url", canonical_url_expr(_resolve(F.col("href"), F.col("src_url")))
        )
        .filter(F.col("dst_url").isNotNull() & (F.col("dst_url") != ""))
        .select("src_url", "dst_url")
    )


# (?s): pretty-printed templates put the anchor text on its own line(s); a
# non-DOTALL '.*?' would silently skip every multi-line anchor.
_ANCHOR_RE = r'(?s)<a\s[^>]*href="[^"]*"[^>]*>.*?</a>'

_ATAG_RE = r'<a\s[^>]*href="[^"]*"[^>]*>'
# the 2019 rel family: any of these tokens denies endorsement
_NOFOLLOW_TOKEN_RE = r"(?i)(^|\s)(nofollow|ugc|sponsored)(\s|$)"


def extract_links_rel(
    docs: DataFrame, url_col: str = "url", html_col: str = "html"
) -> DataFrame:
    """(src_url, dst_url, nofollow) — :func:`extract_links` plus rel
    semantics: ``nofollow`` is 1 when the tag's (double-quoted) rel
    attribute carries any of the endorsement-denial tokens
    ``nofollow``/``ugc``/``sponsored`` (the post-2019 rel family), else 0.

    Rank-family consumers (pagerank/trustrank/HITS) must drop nofollow
    edges — they are the web's explicit "this link is not a vote" marker,
    and counting them is the textbook comment-spam amplifier — while alias
    and discovery consumers keep them.  Same resolution/canonicalization
    contract as extract_links; same one-explode narrow JVM shape."""
    text = F.decode(F.col(html_col), "UTF-8")
    href = F.regexp_extract(F.col("a"), r'href="([^"]*)"', 1)
    # (?<![\w-]) pins the attribute NAME: without it the pattern matches
    # the 'rel="' tail inside data-rel=/myrel= and misreads widget
    # attributes as rel semantics
    rel = F.regexp_extract(F.col("a"), r'(?i)(?<![\w-])rel\s*=\s*"([^"]*)"', 1)
    return (
        docs.select(
            F.col(url_col).alias("src_url"),
            F.explode(
                F.regexp_extract_all(text, F.lit(_ATAG_RE), F.lit(0))
            ).alias("a"),
        )
        .select(
            "src_url",
            canonical_url_expr(_resolve(href, F.col("src_url"))).alias("dst_url"),
            rel.rlike(_NOFOLLOW_TOKEN_RE).cast("int").alias("nofollow"),
        )
        .filter(F.col("dst_url").isNotNull() & (F.col("dst_url") != ""))
    )


def extract_anchors(
    docs: DataFrame,
    url_col: str = "url",
    html_col: str = "html",
    carry: dict[str, Column] | None = None,
) -> DataFrame:
    """(src_url, dst_url, anchor[, *carry]) — like :func:`extract_links` but
    keeping each link's visible anchor text (inner tags stripped, whitespace
    trimmed/collapsed, lowercased).  Anchor text is the web's free entity
    alias evidence: aggregated per target it feeds the KG linker's candidate
    priors (operators/linking.py) the same way alias surface forms from SVO
    extraction do.  ``carry`` maps extra output names to page-level
    expressions carried through the explode as scalars — the no-self-join
    way for consumers (anchor_typed_edges) to keep page context."""
    text = F.decode(F.col(html_col), "UTF-8")
    carry = carry or {}
    href = F.regexp_extract(F.col("a"), r'href="([^"]*)"', 1)
    inner = F.regexp_extract(F.col("a"), r"(?s)>(.*)</a>$", 1)
    anchor = F.lower(
        F.trim(F.regexp_replace(F.regexp_replace(inner, r"<[^>]*>", ""), r"\s+", " "))
    )
    resolved = _resolve(href, F.col("src_url"))
    return (
        docs.select(
            F.col(url_col).alias("src_url"),
            *[expr.alias(name) for name, expr in carry.items()],
            F.explode(
                F.regexp_extract_all(text, F.lit(_ANCHOR_RE), F.lit(0))
            ).alias("a"),
        )
        .select(
            "src_url",
            *carry.keys(),
            canonical_url_expr(resolved).alias("dst_url"),
            anchor.alias("anchor"),
        )
        .filter(F.col("dst_url").isNotNull() & (F.col("dst_url") != ""))
    )


def anchor_aliases(anchors: DataFrame) -> DataFrame:
    """(dst_url, anchor, n_mentions) — the mined alias table (map-side
    combinable; at web scale this is THE input to anchor-based entity
    alias dictionaries)."""
    return anchors.groupBy("dst_url", "anchor").agg(
        F.count(F.lit(1)).cast("long").alias("n_mentions")
    )


def host_edges(links: DataFrame, keep_self: bool = False) -> DataFrame:
    """(src_host, dst_host, n_links) aggregated from a page-level link frame;
    intra-host edges drop by default (chrome/nav self-links dominate raw
    counts and carry no cross-host authority).  Rows whose src url has no
    parseable host (scheme-less input) are dropped — a '' node must never
    enter the host graph."""
    e = links.select(
        host_of(F.col("src_url")).alias("src_host"),
        host_of(F.col("dst_url")).alias("dst_host"),
    ).filter((F.col("src_host") != "") & (F.col("dst_host") != ""))
    if not keep_self:
        e = e.filter(F.col("src_host") != F.col("dst_host"))
    return e.groupBy("src_host", "dst_host").agg(
        F.count(F.lit(1)).cast("long").alias("n_links")
    )


def host_outlink_profile(links: DataFrame) -> DataFrame:
    """(src_host, n_links, n_dst_hosts, n_self, diversity_i) — per-host
    outlink hygiene from the page-level link frame: total out-links,
    distinct destination hosts, self-links, and scaled link diversity
    ``round(1e4 · n_dst_hosts / n_links)``.  Low diversity at high volume
    is the classic link-farm / SEO-spam signature; the host-authority
    prior (host_pagerank) and crawl scheduler both consume it.

    100 TB shape: one map-side-combinable aggregate keyed on src_host
    (host cardinality output); the integer ratio rounds once per host."""
    hosts = links.select(
        host_of(F.col("src_url")).alias("src_host"),
        host_of(F.col("dst_url")).alias("dst_host"),
    )
    return hosts.groupBy("src_host").agg(
        F.count(F.lit(1)).cast("long").alias("n_links"),
        F.countDistinct("dst_host").cast("long").alias("n_dst_hosts"),
        F.sum((F.col("dst_host") == F.col("src_host")).cast("long"))
        .cast("long")
        .alias("n_self"),
        F.round(
            F.lit(10000.0) * F.countDistinct("dst_host") / F.count(F.lit(1))
        )
        .cast("long")
        .alias("diversity_i"),
    )


def host_pagerank(
    docs: DataFrame,
    damping: float = 0.85,
    iterations: int = 5,
    num_partitions: int | None = None,
) -> DataFrame:
    """(node, pr) over the DISTINCT cross-host edge set of a raw HTML corpus
    — extraction composed with operators/graph.py::pagerank (which dedups
    edges itself; weights intentionally don't enter the classic recurrence).
    ``num_partitions`` should track the HOST-graph size (orders of magnitude
    below the page corpus), not the input's parallelism."""
    from aiwhispr_spark.operators.graph import pagerank

    edges = host_edges(extract_links(docs)).select(
        F.col("src_host").alias("src"), F.col("dst_host").alias("dst")
    )
    return pagerank(
        edges, damping=damping, iterations=iterations, num_partitions=num_partitions
    )


def host_trustrank(
    docs: DataFrame,
    seed_hosts: list[str],
    damping: float = 0.85,
    iterations: int = 5,
    num_partitions: int | None = None,
) -> DataFrame:
    """(node, tr) — TrustRank over the cross-host link graph: personalized
    PageRank whose teleport set is a curated whitelist of trusted hosts
    (graph.py::personalized_pagerank).  The web-spam counterpart of
    :func:`host_pagerank`: rank mass that survives ONLY via trusted
    endorsement; `pr - tr` is the spam-mass numerator (Gyöngyi et al. 2004).

    100 TB shape identical to host_pagerank — the recurrence runs on the
    aggregated HOST graph, orders of magnitude smaller than the page corpus;
    the seed list is a broadcast-sized frame."""
    from aiwhispr_spark.operators.graph import personalized_pagerank

    edges = host_edges(extract_links(docs)).select(
        F.col("src_host").alias("src"), F.col("dst_host").alias("dst")
    )
    seeds = docs.sparkSession.createDataFrame(
        [(h,) for h in sorted(set(seed_hosts))], "node string"
    )
    return personalized_pagerank(
        edges,
        seeds,
        damping=damping,
        iterations=iterations,
        num_partitions=num_partitions,
    )


def link_reciprocity(edges: DataFrame) -> DataFrame:
    """Per-host link-exchange profile over the DISTINCT cross-host edge set:
    (host, n_out, n_reciprocal, reciprocity_i) where ``n_reciprocal`` counts
    out-neighbors that link back and ``reciprocity_i = ⌊10^6·recip/out⌋``.

    A high reciprocity share on a high-out-degree host is the classic
    link-farm / link-exchange-ring signal (complements
    :func:`host_outlink_profile`'s volume stats) — legitimate hubs point at
    many hosts that never point back.

    Scale shape: runs on the aggregated host graph.  The reverse-edge probe
    is a self-join on the canonical pair key — map-side combinable distinct
    first, and the join key (src, dst) is the host-pair, so skew follows the
    host-graph head which the distinct already collapsed to one row."""
    e = (
        edges.select(F.col("src").cast("string"), F.col("dst").cast("string"))
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )
    # rev is a pure column swap of the already-distinct e — no re-dedup needed
    rev = e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    marked = e.join(rev.withColumn("has_rev", F.lit(1)), ["src", "dst"], "left")
    return (
        marked.groupBy(F.col("src").alias("host"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_out"),
            F.sum(F.coalesce(F.col("has_rev"), F.lit(0))).cast("long").alias(
                "n_reciprocal"
            ),
        )
        .select(
            "host",
            "n_out",
            "n_reciprocal",
            F.expr("CAST((1000000 * n_reciprocal) div n_out AS BIGINT)").alias(
                "reciprocity_i"
            ),
        )
    )


def anchor_commonness(
    aliases: DataFrame, scale: int = 1_000_000
) -> DataFrame:
    """Commonness prior P(entity | anchor) from the mined alias table
    ((dst_url, anchor, n_mentions) — :func:`anchor_aliases`): for each
    anchor surface, each candidate target's share of that anchor's total
    mentions, as the integer ``prior_i = floor(scale·n/(total))`` (exact
    integer division — cross-engine reproducible, no float sum).

    This is the classic anchor-dictionary baseline for entity linking
    (Wikipedia "commonness"): at web scale the alias table IS the model.
    One groupBy for the per-anchor totals, broadcast back by anchor — the
    per-anchor candidate list is tiny even when the table has 10^9 rows."""
    totals = aliases.groupBy("anchor").agg(
        F.sum("n_mentions").cast("long").alias("n_total")
    )
    return aliases.join(totals, "anchor").select(
        "anchor",
        "dst_url",
        F.col("n_mentions").cast("long").alias("n_mentions"),
        "n_total",
        # `div` = true integer division (float '/'+floor can misround at
        # exact quotients; DuckDB twin uses '//')
        F.expr(f"CAST(({int(scale)} * n_mentions) div n_total AS BIGINT)").alias(
            "prior_i"
        ),
    )


def disambiguate_by_prior(commonness: DataFrame) -> DataFrame:
    """Argmax-commonness mention disambiguation: each anchor surface resolves
    to its most-linked target (ties → lexicographically smallest dst_url) —
    the deterministic baseline every contextual linker is measured against.
    One partitioned row_number window keyed on the anchor (never global)."""
    from pyspark.sql.window import Window

    w = Window.partitionBy("anchor").orderBy(
        F.desc("n_mentions"), F.asc("dst_url")
    )
    return (
        commonness.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select("anchor", "dst_url", "n_mentions", "n_total", "prior_i")
    )


def _overlap_pairs(rel: DataFrame, max_fanout: int = 1000) -> DataFrame:
    """Pairs of ``item``s sharing ``key``s over a DISTINCT (key, item)
    relation: (a, b, n_common, deg_a, deg_b, jaccard_i), a < b.  Keys whose
    fan-out exceeds ``max_fanout`` are dropped from the wedge join entirely
    (a hub citing everyone carries no similarity signal and is exactly the
    key that fans out quadratically) — degrees are counted AFTER the drop so
    jaccard stays internally consistent."""
    d = rel.select("key", "item").distinct()
    small = (
        d.groupBy("key")
        .agg(F.count(F.lit(1)).alias("_fan"))
        .filter(F.col("_fan") <= max_fanout)
        .select("key")
    )
    d = d.join(small, "key", "left_semi")
    deg = d.groupBy("item").agg(F.count(F.lit(1)).cast("long").alias("deg"))
    l = d.select("key", F.col("item").alias("a"))
    r = d.select("key", F.col("item").alias("b"))
    pairs = (
        l.join(r, "key")
        .filter(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).cast("long").alias("n_common"))
    )
    return (
        pairs.join(deg.select(F.col("item").alias("a"), F.col("deg").alias("deg_a")), "a")
        .join(deg.select(F.col("item").alias("b"), F.col("deg").alias("deg_b")), "b")
        .select(
            "a",
            "b",
            "n_common",
            "deg_a",
            "deg_b",
            F.expr("1000000 * n_common div (deg_a + deg_b - n_common)")
            .cast("long")
            .alias("jaccard_i"),
        )
    )


def host_pagerank_drift(
    docs: DataFrame,
    epoch_expr: Column,
    damping: float = 0.85,
    iterations: int = 5,
    num_partitions: int | None = None,
    scale: int = 1_000_000,
) -> DataFrame:
    """Authority drift between two crawl epochs: :func:`host_pagerank` runs
    on each epoch's pages (``epoch_expr`` boolean — False → epoch A, True →
    epoch B), scaled ranks full-outer join on host, and
    ``drift_i = pr_b_i − pr_a_i``.  A host absent from an epoch carries 0
    (it held no rank then) — new hosts show +pr_b, vanished hosts −pr_a; a
    large positive drift on a young host is the classic spam-burst flag,
    symmetric negative drift is a dying mirror.

    Scale shape: two independent host-graph pageranks (each |hosts|-sized,
    see host_pagerank) + one host-keyed join of two |hosts| tables."""

    def side(flt: Column) -> DataFrame:
        pr = host_pagerank(
            docs.filter(flt),
            damping=damping,
            iterations=iterations,
            num_partitions=num_partitions,
        )
        return pr.select(
            "node", F.round(F.col("pr") * scale).cast("long").alias("pr_i")
        )

    a = side(~epoch_expr).withColumnRenamed("pr_i", "pr_a_i")
    b = side(epoch_expr).withColumnRenamed("pr_i", "pr_b_i")
    return (
        a.join(b, "node", "full_outer")
        .select(
            "node",
            F.coalesce("pr_a_i", F.lit(0)).cast("long").alias("pr_a_i"),
            F.coalesce("pr_b_i", F.lit(0)).cast("long").alias("pr_b_i"),
        )
        .withColumn("drift_i", (F.col("pr_b_i") - F.col("pr_a_i")).cast("long"))
    )


def mirror_host_pairs(
    pages: DataFrame,
    host_col: str = "host",
    content_col: str = "text",
    max_fanout: int = 1000,
    min_shared: int = 5,
    min_jaccard_i: int = 200_000,
) -> DataFrame:
    """Mirror-site detection by CONTENT overlap: hosts whose page-fingerprint
    sets share ≥ ``min_shared`` fingerprints at Jaccard ≥ ``min_jaccard_i``
    (scaled 1e6) — the crawl-curation step that collapses full and partial
    mirrors (CDNs, country TLD clones, scraped re-hosts) BEFORE per-host
    stats or authority ranks are computed, where mirrors would double-count.

    Fingerprint = md5 of the page content (exact-copy semantics; swap in a
    simhash for near-copy mirroring).  The host-pair wedge is
    :func:`_overlap_pairs` on the (fingerprint, host) relation — the same
    hub-cap discipline as co-citation: a fingerprint present on more than
    ``max_fanout`` hosts (boilerplate like an empty page) is dropped from
    candidate generation, and degrees count after the drop."""
    rel = pages.select(
        F.md5(F.col(content_col).cast("string")).alias("key"),
        F.col(host_col).alias("item"),
    )
    out = _overlap_pairs(rel, max_fanout=max_fanout)
    return out.filter(
        (F.col("n_common") >= min_shared) & (F.col("jaccard_i") >= min_jaccard_i)
    )


def cocitation_pairs(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    max_fanout: int = 1000,
) -> DataFrame:
    """Co-citation similarity (Small 1973, the web-graph classic): pairs of
    DESTINATION hosts cited by the same sources — the "related sites"
    signal PageRank doesn't give (authority ranks, this relates).  deg_* are
    in-degrees in distinct-source terms; jaccard_i over citing-source sets.

    100 TB shape: distinct on the edge, hub sources over ``max_fanout``
    dropped before the src-keyed wedge join (quadratic-key guard, same
    policy as the ER stop-fact cap), aggregates map-side combine."""
    return _overlap_pairs(
        edges.select(F.col(src_col).alias("key"), F.col(dst_col).alias("item")),
        max_fanout=max_fanout,
    )


def coupling_pairs(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    max_fanout: int = 1000,
) -> DataFrame:
    """Bibliographic coupling (Kessler 1963): pairs of SOURCE hosts citing
    the same destinations — the transpose of :func:`cocitation_pairs`
    (co-citation relates what others point AT together; coupling relates
    who points at the same things).  Same wedge/caps discipline."""
    return _overlap_pairs(
        edges.select(F.col(dst_col).alias("key"), F.col(src_col).alias("item")),
        max_fanout=max_fanout,
    )


# anchor-pattern → predicate map, documented subset (lowercased anchors —
# extract_anchors lowercases; oracle mirrors the same alternations)
ANCHOR_PREDICATES: list[tuple[str, str]] = [
    ("homepage", r"^(official (web)?site|official homepage|homepage|website)$"),
    ("contact_page", r"^(contact( us)?|imprint|impressum)$"),
    ("source_repo", r"^(source( code)?|github|repository)$"),
]


def anchor_typed_edges(
    docs: DataFrame,
    url_col: str = "url",
    html_col: str = "html",
) -> DataFrame:
    """Typed KG edges from anchor-text conventions: a link whose visible
    text says "official website" asserts a ``homepage`` fact about the
    PAGE'S principal entity (og:title, url fallback) — link structure as a
    fact source, the relational upgrade of :func:`anchor_aliases` (which
    only names the target).  Documented predicate table above; anchors that
    match no pattern emit nothing (navigation noise stays out).

    Output: (src_url, subj, pred, obj) with obj = the canonicalized link
    target.  Repeated identical assertions on one page collapse (distinct).

    100 TB shape: rides the same single anchor-explode projection as
    extract_anchors with the subject CARRIED as a scalar (``carry`` — no
    self-join, no page-scale broadcast); the pattern CASE is pure JVM;
    distinct is the only exchange.
    """
    from aiwhispr_spark.operators.structured import _meta_content

    text = F.decode(F.col(html_col), "UTF-8")
    subj = F.coalesce(
        F.nullif(_meta_content(text, "property", "og:title"), F.lit("")),
        F.col(url_col),
    )
    anchors = extract_anchors(
        docs, url_col=url_col, html_col=html_col, carry={"subj": subj}
    )
    pred = F.lit(None).cast("string")
    for name, rx in reversed(ANCHOR_PREDICATES):
        pred = F.when(F.col("anchor").rlike(rx), F.lit(name)).otherwise(pred)
    return (
        anchors.select(
            "src_url", "subj", pred.alias("pred"), F.col("dst_url").alias("obj")
        )
        .where(F.col("pred").isNotNull())
        .distinct()
    )


def host_spam_mass(
    docs: DataFrame,
    seed_hosts: list[str],
    damping: float = 0.85,
    iterations: int = 5,
    num_partitions: int | None = None,
) -> DataFrame:
    """Link-spam mass estimation (Gyöngyi, Garcia-Molina & Pedersen 2004,
    "Link Spam Detection Based on Mass Estimation"): for every host,
    ``mass = pr − tr`` — the PageRank share NOT attributable to trusted
    endorsement — and the relative mass ``rel = mass / pr``.  Hosts whose
    rank is mostly spam mass (rel near 1) earn their authority from
    untrusted link structure: the actionable spam flag that neither
    :func:`host_pagerank` nor :func:`host_trustrank` yields alone.

    Returns (node, pr_i, tr_i, mass_i, rel_i) — scaled BIGINTs
    (round(1e6·x)); ``rel_i`` is −1 when the host has no PageRank row
    (a whitelisted seed absent from the crawl's link graph).

    Scale shape: the page→host edge aggregation runs ONCE and is persisted
    (both rank passes iterate over the same host graph, orders of magnitude
    smaller than the corpus); the two recurrences then add one extra
    broadcast-sized join to align pr and tr.  The single pr division is the
    one permitted IEEE float step (the assortativity precedent) — both
    inputs are association-pinned doubles, so the quotient is
    cross-engine-stable."""
    from aiwhispr_spark.operators.graph import pagerank, personalized_pagerank

    edges = (
        host_edges(extract_links(docs))
        .select(F.col("src_host").alias("src"), F.col("dst_host").alias("dst"))
        .persist()
    )
    pr = pagerank(
        edges, damping=damping, iterations=iterations, num_partitions=num_partitions
    )
    seeds = docs.sparkSession.createDataFrame(
        [(h,) for h in sorted(set(seed_hosts))], "node string"
    )
    tr = personalized_pagerank(
        edges,
        seeds,
        damping=damping,
        iterations=iterations,
        num_partitions=num_partitions,
    ).withColumnRenamed("pr", "tr")
    # both rank passes are eager and return localCheckpointed frames —
    # the shared edge cache is done; dropping it here (not at GC time)
    # keeps long-lived drivers from pinning one host-graph copy per call
    edges.unpersist()
    joined = pr.join(tr, "node", "full_outer").select(
        "node",
        F.coalesce(F.col("pr"), F.lit(0.0)).alias("prv"),
        F.coalesce(F.col("tr"), F.lit(0.0)).alias("trv"),
        F.col("pr").isNull().alias("no_pr"),
    )
    mass = F.col("prv") - F.col("trv")
    return joined.select(
        "node",
        F.round(F.col("prv") * 1000000).cast("long").alias("pr_i"),
        F.round(F.col("trv") * 1000000).cast("long").alias("tr_i"),
        F.round(mass * 1000000).cast("long").alias("mass_i"),
        F.when(F.col("no_pr"), F.lit(-1))
        .otherwise(F.round(mass * 1000000 / F.col("prv")))
        .cast("long")
        .alias("rel_i"),
    )


def milne_witten_relatedness(rel: DataFrame, max_fanout: int = 1000) -> DataFrame:
    """(a, b, n_common, deg_a, deg_b, mw_mi) — Milne–Witten semantic
    relatedness (WLM, Milne & Witten 2008) between items from shared keys:

        sr(a,b) = 1 − (ln max(|A|,|B|) − ln |A∩B|) / (ln N − ln min(|A|,|B|))

    with A/B the key sets of each item and N the key universe — THE
    standard relatedness measure entity-linking coherence objectives
    (AIDA/TagMe-style collective disambiguation) optimize; mention co-occur
    docs here play the role Wikipedia inlinks play in the original.

    Exactness: counts are exact BIGINTs from the `_overlap_pairs` wedge
    (hub-capped, a < b); the ln/division enters as ONE closed-form float
    step over four integers, emitted as round(1e4·sr) clamped at 0
    (negative WLM means "less related than chance"), −1 sentinel when the
    denominator is 0 (an item present in every key).

    100 TB shape: identical to the wedge — one (key,item) exchange, hub
    keys dropped before the self-join; N is a 1-row broadcast.
    """
    pairs = _overlap_pairs(rel, max_fanout=max_fanout)
    n_keys = rel.select("key").distinct().agg(
        F.count(F.lit(1)).cast("long").alias("n_keys")
    )
    sr = (
        "1.0 - (ln(greatest(deg_a, deg_b)) - ln(n_common))"
        " / (ln(n_keys) - ln(least(deg_a, deg_b)))"
    )
    return pairs.crossJoin(F.broadcast(n_keys)).select(
        "a",
        "b",
        "n_common",
        "deg_a",
        "deg_b",
        F.when(F.expr("ln(n_keys) = ln(least(deg_a, deg_b))"), F.lit(-1))
        .otherwise(F.greatest(F.lit(0), F.expr(f"round(10000 * ({sr}))").cast("long")))
        .cast("long")
        .alias("mw_mi"),
    )


def tracker_script_signals(
    pages: DataFrame, url_col: str = "url", html_col: str = "html"
) -> DataFrame:
    """(url, n_scripts, n_external, n_third_party, n_tracker,
    tracker_density_i) — per-page surveillance/boilerplate signal: script
    tags, external script srcs, third-party srcs (absolute http(s) host ≠
    page host; relative and protocol-less srcs are same-origin by the
    fetch model), and known-tracker hosts by the rule list
    ^(analytics|pixel|tracker|ads)\\. — the ad-tech subdomain convention;
    a production deployment swaps in a curated blocklist table
    (broadcast join on host) without changing the plan shape.  density =
    n_tracker·1e4 div n_scripts (−1 when scriptless, the visible-sentinel
    rule).

    100 TB shape: pure JVM regex + array lambdas per page — zero
    exchanges, zero python (pii_redact's plan class)."""
    page_host = F.regexp_extract(F.col(url_col), r"^https?://([^/:?#]+)", 1)
    open_tags = F.expr(rf"regexp_extract_all({html_col}, '<script\\b[^>]*>', 0)")
    srcs = F.expr(
        rf"""regexp_extract_all({html_col}, '<script\\b[^>]*?src="([^"]*)"', 1)"""
    )
    hosts = F.transform(
        srcs, lambda s: F.regexp_extract(s, r"^https?://([^/:?#]+)", 1)
    )
    n_scripts = F.size(open_tags).cast("long")
    n_external = F.size(srcs).cast("long")
    ph = page_host
    n_third = F.size(
        F.filter(hosts, lambda h: (h != F.lit("")) & (h != ph))
    ).cast("long")
    n_tracker = F.size(
        F.filter(hosts, lambda h: h.rlike(r"^(analytics|pixel|tracker|ads)\."))
    ).cast("long")
    return pages.select(
        F.col(url_col).alias("url"),
        n_scripts.alias("n_scripts"),
        n_external.alias("n_external"),
        n_third.alias("n_third_party"),
        n_tracker.alias("n_tracker"),
    ).withColumn(
        "tracker_density_i",
        F.when(
            F.col("n_scripts") > 0,
            F.expr("(n_tracker * 10000) div n_scripts"),
        )
        .otherwise(F.lit(-1))
        .cast("long"),
    )


def bipartite_butterflies(rel: DataFrame, max_fanout: int = 1000) -> DataFrame:
    """Butterfly (2×2 biclique) counts over a bipartite (key, item)
    incidence — the bipartite clustering primitive (Wang et al. 2019,
    "Vertex Priority Based Butterfly Counting"): a butterfly is two items
    sharing two keys, the smallest cohesion motif a host↔token or
    doc↔entity graph has (triangles don't exist in bipartite graphs).

    Counting rides :func:`_overlap_pairs`: per item pair with n_common
    shared keys there are C(n_common, 2) butterflies, so the pair join IS
    the count — no 4-node enumeration.  The hub cap (keys with fan-out >
    max_fanout dropped) is the same skew guard the wedge join needs anyway.

    Output: (item, n_butterflies) per item — each butterfly counted once
    per endpoint item — plus an '(all)' row with the GLOBAL butterfly
    total (each counted once).

    100 TB shape: everything downstream of the hub-capped wedge join is
    pair-keyed and map-side combinable; per-item rollup keys on the item.
    """
    pairs = _overlap_pairs(rel, max_fanout=max_fanout).filter(
        F.col("n_common") >= 2
    )
    bf = pairs.select(
        "a", "b", F.expr("n_common * (n_common - 1) div 2").alias("bf")
    )
    per_item = (
        bf.select(F.explode(F.array("a", "b")).alias("item"), "bf")
        .groupBy("item")
        .agg(F.sum("bf").alias("n_butterflies"))
    )
    total = bf.agg(
        F.lit("(all)").alias("item"),
        F.coalesce(F.sum("bf"), F.lit(0)).alias("n_butterflies"),
    )
    return per_item.unionByName(total)


def partition_edgecut_eval(
    edges: DataFrame,
    n_parts: int = 8,
    src_col: str = "src_host",
    dst_col: str = "dst_host",
    weight_col: str = "n_links",
) -> DataFrame:
    """Edge-cut comparison of graph partitioning schemes over the host
    graph — the planning query behind a distributed-graph layout choice:

    * ``hash``   — partition = md5(host) mod P (what a naive
      ``repartition(P, host)`` does);
    * ``domain`` — partition = md5(registrable domain) mod P
      (domain-locality placement: most web links are intra-domain, so
      co-locating a domain's hosts slashes cross-partition traffic — the
      standard web-graph trick, at the cost of domain-size skew).

    Emits one row per scheme: (scheme, n_parts, n_edges, cut_edges,
    cut_links, cut_bp, max_part_hosts, balance_bp) where cut_bp =
    link-weighted cut share ·10⁴ and balance_bp = max-partition size ·
    P·10⁴ div n_hosts (10000 = perfect balance; the hash/domain rows
    together expose the locality-vs-balance trade).

    100 TB shape: two tiny aggregates per scheme over the HOST-level edge
    frame (already corpus-collapsed); nothing touches pages."""
    from .urlnorm import registrable_domain_expr

    def part_of(col, scheme: str):
        key = col if scheme == "hash" else registrable_domain_expr(col)
        return (
            F.conv(F.substring(F.md5(key), 1, 13), 16, 10).cast("long")
            % n_parts
        )

    hosts = (
        edges.select(F.col(src_col).alias("h"))
        .unionByName(edges.select(F.col(dst_col).alias("h")))
        .distinct()
    )
    outs = []
    for scheme in ("hash", "domain"):
        e = edges.select(
            part_of(F.col(src_col), scheme).alias("ps"),
            part_of(F.col(dst_col), scheme).alias("pd"),
            F.col(weight_col).alias("w"),
        )
        agg = e.agg(
            F.count(F.lit(1)).cast("long").alias("n_edges"),
            F.sum((F.col("ps") != F.col("pd")).cast("long")).alias("cut_edges"),
            F.sum(
                F.when(F.col("ps") != F.col("pd"), F.col("w")).otherwise(0)
            )
            .cast("long")
            .alias("cut_links"),
            F.sum("w").cast("long").alias("total_links"),
        )
        bal = (
            hosts.groupBy(part_of(F.col("h"), scheme).alias("p"))
            .agg(F.count(F.lit(1)).alias("c"))
            .agg(
                F.max("c").cast("long").alias("max_part_hosts"),
                F.sum("c").cast("long").alias("n_hosts"),
            )
        )
        outs.append(
            agg.crossJoin(bal).select(
                F.lit(scheme).alias("scheme"),
                F.lit(n_parts).cast("long").alias("n_parts"),
                "n_edges",
                "cut_edges",
                F.expr("cut_links * 10000L div total_links").alias("cut_bp"),
                "max_part_hosts",
                F.expr(
                    f"max_part_hosts * {n_parts}L * 10000L div n_hosts"
                ).alias("balance_bp"),
            )
        )
    return outs[0].unionByName(outs[1])
