"""Structured-data extraction: JSON-LD script blocks, OpenGraph/meta tags,
and wiki-style infobox tables mined into KG triples.

The reference mines only unstructured sentence text (SVO patterns over the
cleaned body — `python/textprocessor` in prasaar/aiwhispr); real web pages
also carry machine-readable facts the page AUTHOR asserted: schema.org
JSON-LD (`<script type="application/ld+json">`), OpenGraph meta tags, and
infobox tables.  Production web KGs are built primarily from this markup,
so a crawl-scale KG engine needs it as a first-class triple source that
unions with the SVO path (same (subj, pred, obj) contract,
provenance-tagged).

Scale shape (100 TB of WARC):
* every extractor here is ONE narrow projection over the page scan — JVM
  regex pulls the blocks, `from_json` (Jackson, whole-stage codegen'd)
  parses them, array/struct expressions emit the triples.  Zero shuffle,
  zero python stage, fused with the scan by Catalyst;
* per-page fan-out is bounded (a handful of nodes per JSON-LD block, a
  handful of infobox rows), so the explode cannot amplify a partition;
* the downstream union with SVO triples needs no reconciliation shuffle of
  its own — both sides already share the triple schema and flow into the
  same canonicalization stage.

Parsing contract (documented subset, mirrored by the unit tests):
* JSON-LD: `application/ld+json` scripts only (any quote style, extra
  attributes allowed); a root `@graph` array OR a bare root node; the
  schema.org fields name/url/founder.name/foundingDate/numberOfEmployees/
  worksFor; `rdf:type` is the lowercased `@type`.  Malformed JSON parses
  to NULL and the page simply contributes no triples (from_json PERMISSIVE).
* meta: property/name and content attributes in either order, either
  quote style; first match per page wins.
* infobox: `<table class="...infobox...">` only; each `<tr>` contributes
  its first `<th>`/`<td>` pair; inner tags strip; whitespace collapses;
  the page's og:title (principal entity) is the subject when present,
  else the page url.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, LongType, StringType, StructField, StructType

_LD_BLOCK_RE = (
    r'(?s)<script[^>]*type=["\']application/ld\+json["\'][^>]*>(.*?)</script>'
)

_NODE_FIELDS = [
    StructField("@type", StringType()),
    StructField("name", StringType()),
    StructField("url", StringType()),
    StructField("foundingDate", StringType()),
    StructField("numberOfEmployees", LongType()),
    StructField("founder", StructType([StructField("name", StringType())])),
    StructField("worksFor", StringType()),
]
_NODE_TYPE = StructType(_NODE_FIELDS)
_ROOT_TYPE = StructType(_NODE_FIELDS + [StructField("@graph", ArrayType(_NODE_TYPE))])


def _meta_content(text: Column, attr: str, key: str) -> Column:
    """content= of the first meta tag whose ``attr`` equals ``key`` —
    attribute order and quote style both free ('' when absent)."""
    fwd = rf'<meta[^>]*{attr}=["\']{key}["\'][^>]*content=["\']([^"\']*)["\']'
    rev = rf'<meta[^>]*content=["\']([^"\']*)["\'][^>]*{attr}=["\']{key}["\']'
    a = F.regexp_extract(text, fwd, 1)
    b = F.regexp_extract(text, rev, 1)
    return F.when(a != "", a).otherwise(b)


def _clean_inner(col: Column) -> Column:
    """Strip inner tags, collapse whitespace, trim — the visible cell text."""
    return F.trim(
        F.regexp_replace(F.regexp_replace(col, r"<[^>]*>", ""), r"\s+", " ")
    )


def extract_jsonld_blocks(
    docs: DataFrame, url_col: str = "url", html_col: str = "html"
) -> DataFrame:
    """(src_url, block) — one row per application/ld+json script body."""
    text = F.decode(F.col(html_col), "UTF-8")
    return docs.select(
        F.col(url_col).alias("src_url"),
        F.explode(F.regexp_extract_all(text, F.lit(_LD_BLOCK_RE), F.lit(1))).alias(
            "block"
        ),
    )


def jsonld_triples(
    docs: DataFrame, url_col: str = "url", html_col: str = "html"
) -> DataFrame:
    """(src_url, subj, pred, obj) from schema.org JSON-LD blocks.

    @graph arrays and bare root nodes both normalize to a node list before
    the per-node triple emission, so the two authoring styles are one code
    path.  All JVM: regex → from_json → array/struct expressions."""
    blocks = extract_jsonld_blocks(docs, url_col, html_col)
    parsed = blocks.select(
        "src_url", F.from_json("block", _ROOT_TYPE).alias("root")
    )
    root_node = F.struct(
        *[F.col("root").getField(f.name).alias(f.name) for f in _NODE_FIELDS]
    )
    nodes = parsed.select(
        "src_url",
        F.explode(
            F.when(F.col("root.@graph").isNotNull(), F.col("root.@graph")).otherwise(
                F.array(root_node)
            )
        ).alias("node"),
    )
    n = F.col("node")
    facts = F.array(
        F.struct(F.lit("rdf:type").alias("pred"), F.lower(n["@type"]).alias("obj")),
        F.struct(F.lit("schema:url").alias("pred"), n["url"].alias("obj")),
        F.struct(
            F.lit("schema:founder").alias("pred"), n["founder"]["name"].alias("obj")
        ),
        F.struct(
            F.lit("schema:foundingDate").alias("pred"), n["foundingDate"].alias("obj")
        ),
        F.struct(
            F.lit("schema:numberOfEmployees").alias("pred"),
            n["numberOfEmployees"].cast("string").alias("obj"),
        ),
        F.struct(F.lit("schema:worksFor").alias("pred"), n["worksFor"].alias("obj")),
    )
    return (
        nodes.select(
            "src_url",
            n["name"].alias("subj"),
            F.explode(facts).alias("fact"),
        )
        .select("src_url", "subj", F.col("fact.pred").alias("pred"), F.col("fact.obj").alias("obj"))
        .filter(F.col("subj").isNotNull() & F.col("obj").isNotNull())
    )


def meta_cards(
    docs: DataFrame, url_col: str = "url", html_col: str = "html"
) -> DataFrame:
    """(url, title, og_title, og_type, description) — one card per page
    (NULL field when the tag is absent).  Pure narrow projection."""
    text = F.decode(F.col(html_col), "UTF-8")
    title = _clean_inner(F.regexp_extract(text, r"(?s)<title[^>]*>(.*?)</title>", 1))
    return docs.select(
        F.col(url_col).alias("url"),
        F.when(title != "", title).alias("title"),
        F.nullif(_meta_content(text, "property", "og:title"), F.lit("")).alias(
            "og_title"
        ),
        F.nullif(_meta_content(text, "property", "og:type"), F.lit("")).alias(
            "og_type"
        ),
        F.nullif(_meta_content(text, "name", "description"), F.lit("")).alias(
            "description"
        ),
    )


_INFOBOX_RE = r'(?s)<table[^>]*class=["\'][^"\']*infobox[^"\']*["\'][^>]*>(.*?)</table>'
_TR_RE = r"(?s)<tr[^>]*>.*?</tr>"


def infobox_triples(
    docs: DataFrame, url_col: str = "url", html_col: str = "html"
) -> DataFrame:
    """(src_url, subj, pred, obj) from infobox tables: pred =
    'infobox:' + lowercased/underscored header, obj = cleaned cell text;
    subj = the page's og:title principal entity (url fallback) — carried
    through the explode as a scalar, so NO self-join is needed."""
    text = F.decode(F.col(html_col), "UTF-8")
    subj = F.coalesce(
        F.nullif(_meta_content(text, "property", "og:title"), F.lit("")),
        F.col(url_col),
    )
    tables = docs.select(
        F.col(url_col).alias("src_url"),
        subj.alias("subj"),
        F.explode(F.regexp_extract_all(text, F.lit(_INFOBOX_RE), F.lit(1))).alias(
            "tbl"
        ),
    )
    rows = tables.select(
        "src_url",
        "subj",
        F.explode(F.regexp_extract_all("tbl", F.lit(_TR_RE), F.lit(0))).alias("tr"),
    )
    key = _clean_inner(F.regexp_extract("tr", r"(?s)<th[^>]*>(.*?)</th>", 1))
    val = _clean_inner(F.regexp_extract("tr", r"(?s)<td[^>]*>(.*?)</td>", 1))
    return (
        rows.select(
            "src_url",
            "subj",
            F.concat(
                F.lit("infobox:"), F.regexp_replace(F.lower(key), r"\s+", "_")
            ).alias("pred"),
            val.alias("obj"),
        )
        .filter((F.col("pred") != "infobox:") & (F.col("obj") != ""))
    )


_TABLE_RE = r"(?s)<table[^>]*>(.*?)</table>"
_TR_CAP_RE = r"(?s)<tr[^>]*>(.*?)</tr>"
_CELL_RE = r"(?s)<t[hd][^>]*>(.*?)</t[hd]>"


def data_table_triples(
    docs: DataFrame, url_col: str = "url", html_col: str = "html"
) -> DataFrame:
    """(src_url, subj, pred, obj) from header-keyed HTML data tables — the
    row-oriented complement of :func:`infobox_triples` (which is
    column-oriented th/td per row).  A table qualifies when its FIRST row is
    a header row of ≥2 ``<th>`` cells; every later row then contributes
    subj = first cell, and for each further cell j: pred = ``table:`` +
    lowercased/underscored header[j], obj = cleaned cell text.

    Semantics mirrored by the DuckDB oracle and the unit tests:
    * ragged rows — a cell beyond the header width has no predicate and is
      dropped (``element_at`` past the header array is NULL);
    * empty cells (after inner-tag strip) emit nothing;
    * the header is carried through the row explode as an array scalar, so
      there is NO self-join: the whole extractor is one narrow projection
      (zero shuffle, fused with the page scan by Catalyst).
    """
    text = F.decode(F.col(html_col), "UTF-8")
    tables = docs.select(
        F.col(url_col).alias("src_url"),
        F.explode(F.regexp_extract_all(text, F.lit(_TABLE_RE), F.lit(1))).alias(
            "tbl"
        ),
    )
    rows_arr = F.regexp_extract_all("tbl", F.lit(_TR_CAP_RE), F.lit(1))
    first_row = F.element_at(rows_arr, 1)
    header = F.transform(
        F.regexp_extract_all(first_row, F.lit(r"(?s)<th[^>]*>(.*?)</th>"), F.lit(1)),
        lambda c: F.regexp_replace(F.lower(_clean_inner(c)), r"\s+", "_"),
    )
    body = F.when(
        F.size(rows_arr) > 1, F.slice(rows_arr, 2, F.size(rows_arr) - 1)
    ).otherwise(F.array().cast("array<string>"))
    rows = tables.select(
        "src_url",
        header.alias("header"),
        F.explode(body).alias("tr"),
    ).filter(F.size("header") >= 2)
    cells = F.transform(
        F.regexp_extract_all("tr", F.lit(_CELL_RE), F.lit(1)),
        lambda c: _clean_inner(c),
    )
    with_cells = rows.select(
        "src_url",
        "header",
        F.element_at(cells, 1).alias("subj"),
        F.posexplode(
            F.when(F.size(cells) > 1, F.slice(cells, 2, F.size(cells) - 1)).otherwise(
                F.array().cast("array<string>")
            )
        ).alias("j0", "obj"),
    )
    # try_element_at: a ragged cell indexes past the header array, which is
    # NULL (dropped) rather than an ANSI out-of-bounds error
    pred = F.try_element_at(F.col("header"), F.col("j0") + 2)
    return with_cells.select(
        "src_url",
        "subj",
        F.concat(F.lit("table:"), pred).alias("pred"),
        "obj",
    ).filter(
        pred.isNotNull()
        & (pred != "")
        & (F.col("subj") != "")
        & (F.col("obj") != "")
    )


_BC_RE = r'(?s)<nav[^>]*class=["\'][^"\']*breadcrumb[^"\']*["\'][^>]*>(.*?)</nav>'


def breadcrumb_taxonomy(
    docs: DataFrame, url_col: str = "url", html_col: str = "html"
) -> DataFrame:
    """(child, parent, n_pages) — SKOS-broader taxonomy edges mined from
    breadcrumb trails, the cheapest category-hierarchy signal on the web
    (every CMS emits one; Wikipedia's category tree is the canonical KG
    use).  Each breadcrumb ``A > B > C`` asserts the consecutive-pair edges
    (B broader A) and (C broader B); n_pages counts asserting pages.

    Contract (unit-pinned, oracle-mirrored):
    * only ``<nav class="...breadcrumb...">`` blocks qualify (first per
      page); other navs are ignored;
    * crumbs are the nav's ``<a>`` labels in order, plus one trailing
      ``<span>`` label when present (the conventional current-page crumb);
    * labels strip inner tags / collapse whitespace; empty labels drop;
    * a single-crumb trail asserts nothing.

    100 TB shape: regex + array expressions are one narrow JVM projection;
    the only exchange carries (child, parent) aggregate rows — taxonomy
    cardinality, not page cardinality (map-side combine)."""
    text = F.decode(F.col(html_col), "UTF-8")
    nav = F.regexp_extract(text, _BC_RE, 1)
    anchors = F.transform(
        F.regexp_extract_all(nav, F.lit(r"(?s)<a[^>]*>(.*?)</a>"), F.lit(1)),
        lambda c: _clean_inner(c),
    )
    span = _clean_inner(F.regexp_extract(nav, r"(?s)<span[^>]*>(.*?)</span>", 1))
    crumbs = F.filter(
        F.concat(anchors, F.array(span)), lambda c: c != ""
    )
    pairs = F.when(
        F.size(crumbs) >= 2,
        F.transform(
            F.sequence(F.lit(2), F.size(crumbs)),
            lambda i: F.struct(
                F.element_at(crumbs, i).alias("child"),
                F.element_at(crumbs, i - 1).alias("parent"),
            ),
        ),
    ).otherwise(F.array().cast("array<struct<child:string,parent:string>>"))
    return (
        docs.select(F.explode(pairs).alias("e"))
        .select(F.col("e.child").alias("child"), F.col("e.parent").alias("parent"))
        .groupBy("child", "parent")
        .agg(F.count(F.lit(1)).cast("long").alias("n_pages"))
    )


def structured_entity_stats(
    docs: DataFrame, url_col: str = "url", html_col: str = "html"
) -> DataFrame:
    """(subj, n_facts, n_pages, n_sources) — the merged structured-KG view:
    JSON-LD and infobox triples union (provenance-tagged) into one
    map-side-combinable aggregate per entity.  The union is two projections
    of the SAME page scan; the only exchange carries (subj, …) aggregate
    rows — entity cardinality, not page cardinality."""
    ld = jsonld_triples(docs, url_col, html_col).withColumn(
        "src", F.lit("jsonld")
    )
    box = infobox_triples(docs, url_col, html_col).withColumn(
        "src", F.lit("infobox")
    )
    return (
        ld.unionByName(box)
        .groupBy("subj")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_facts"),
            F.countDistinct("src_url").cast("long").alias("n_pages"),
            F.countDistinct("src").cast("long").alias("n_sources"),
        )
    )


# --- schema.org microdata (HTML attribute syntax) ------------------------------------

# a microdata scope: itemscope + itemtype on a div/section/article container
_MD_SCOPE_RE = (
    r'(?s)<(?:div|section|article)\b[^>]*\bitemscope\b[^>]*'
    r'\bitemtype="([^"]+)"[^>]*>(.*?)</(?:div|section|article)>'
)
# one property: itemprop first, optional content attr, else inner text
_MD_PROP_RE = r'\bitemprop="([^"]+)"(?:[^>]*\bcontent="([^"]*)")?[^>]*>([^<]*)'


def _scoped_attr_triples(
    docs: DataFrame,
    url_col: str,
    html_col: str,
    scope_re: str,
    prop_re: str,
    type_seg_re: str,
) -> DataFrame:
    """Shared machinery for the two HTML-ATTRIBUTE structured syntaxes
    (microdata's itemscope/itemprop and RDFa-lite's typeof/property): a
    typed container scope holds property elements whose value is the
    ``content`` attribute when present else inner text; the scope's
    ``name`` property is the SUBJECT (nameless scopes emit nothing).
    One narrow JVM regex projection per page, zero python, zero extra
    shuffle; the emit is array transforms carried through a single
    explode."""
    text = F.decode(F.col(html_col), "UTF-8")
    types = F.regexp_extract_all(text, F.lit(scope_re), F.lit(1))
    bodies = F.regexp_extract_all(text, F.lit(scope_re), F.lit(2))
    scopes = docs.select(
        F.col(url_col).alias("src_url"),
        F.explode(F.arrays_zip(types.alias("itype"), bodies.alias("body"))).alias("s"),
    ).select(
        "src_url",
        F.regexp_extract(F.col("s.itype"), type_seg_re, 1).alias("itype"),
        F.col("s.body").alias("body"),
    )

    def _prop_structs(body: Column) -> Column:
        names = F.regexp_extract_all(body, F.lit(prop_re), F.lit(1))
        contents = F.regexp_extract_all(body, F.lit(prop_re), F.lit(2))
        inners = F.regexp_extract_all(body, F.lit(prop_re), F.lit(3))
        zipped = F.arrays_zip(names.alias("p"), contents.alias("c"), inners.alias("t"))
        return F.transform(
            zipped,
            lambda s: F.struct(
                s["p"].alias("p"),
                F.when(s["c"] != "", s["c"]).otherwise(F.trim(s["t"])).alias("v"),
            ),
        )

    props = scopes.select(
        "src_url", "itype", _prop_structs(F.col("body")).alias("props")
    )
    name = F.filter(F.col("props"), lambda s: s["p"] == "name")
    withname = props.select(
        "src_url",
        "itype",
        # F.get is NULL-safe on empty arrays (ANSI element_at throws)
        F.get(name, 0)["v"].alias("subj"),
        F.filter(F.col("props"), lambda s: s["p"] != "name").alias("facts"),
    ).filter(F.col("subj").isNotNull() & (F.col("subj") != ""))
    return withname.select(
        "src_url",
        "subj",
        F.explode("facts").alias("f"),
        "itype",
    ).select(
        "src_url",
        "subj",
        F.col("f.p").alias("pred"),
        F.col("f.v").alias("obj"),
        "itype",
    ).filter(F.col("obj") != "")


def microdata_triples(
    docs: DataFrame, url_col: str = "url", html_col: str = "html"
) -> DataFrame:
    """(src_url, subj, pred, obj, itype) from schema.org MICRODATA markup —
    the HTML-attribute sibling of :func:`jsonld_triples` (real pages use
    either syntax; a structured-data miner needs both).

    Documented flat subset (oracle-mirrored):
    * a scope is a ``div``/``section``/``article`` carrying ``itemscope`` +
      ``itemtype`` with no nested scope of the same tag name; ``itype`` is
      the last path segment of the itemtype URL;
    * a property element carries ``itemprop`` (first attribute position),
      its value the ``content`` attribute when present and non-empty, else
      the element's inner text;
    * the scope's ``name`` property is the SUBJECT; scopes without a name
      identify nothing and emit nothing (the infobox miner's og:title
      discipline, per-scope)."""
    return _scoped_attr_triples(
        docs, url_col, html_col, _MD_SCOPE_RE, _MD_PROP_RE, r"([^/]+)$"
    )


# RDFa-lite: typeof= on the container, property= on value elements.  typeof
# is usually a CURIE (schema:Person) or bare term, so the type segment
# splits on /, #, or : — the last segment is the local type name.
_RDFA_SCOPE_RE = (
    r'(?s)<(?:div|section|article)\b[^>]*'
    r'\btypeof="([^"]+)"[^>]*>(.*?)</(?:div|section|article)>'
)
_RDFA_PROP_RE = r'\bproperty="([^"]+)"(?:[^>]*\bcontent="([^"]*)")?[^>]*>([^<]*)'


def rdfa_triples(
    docs: DataFrame, url_col: str = "url", html_col: str = "html"
) -> DataFrame:
    """(src_url, subj, pred, obj, itype) from RDFa-LITE markup — the third
    structured-data syntax next to :func:`jsonld_triples` and
    :func:`microdata_triples` (W3C's attribute vocabulary: ``vocab``/
    ``typeof``/``property``; Facebook-era pages and Drupal sites emit RDFa
    where newer CMSes emit microdata — a crawl-scale miner needs all three).

    Documented flat subset, same discipline as microdata (oracle-mirrored):
    * a scope is a ``div``/``section``/``article`` carrying
      ``typeof="T"``; ``itype`` is the last ``/``/``#``/``:`` segment of T
      (CURIEs like ``schema:Person`` and IRIs both reduce to the local
      name);
    * a property element carries ``property="p"``; its value is the
      ``content`` attribute when present and non-empty, else inner text;
    * the scope's ``name`` property is the SUBJECT; nameless scopes emit
      nothing.

    100 TB shape: identical to microdata — one narrow JVM regex projection
    fused with the page scan, zero python, zero shuffle."""
    return _scoped_attr_triples(
        docs, url_col, html_col, _RDFA_SCOPE_RE, _RDFA_PROP_RE, r"([^/#:]+)$"
    )


_LIST_RE = r"(?s)<h[1-6][^>]*>([^<]*)</h[1-6]>\s*<[uo]l[^>]*>(.*?)</[uo]l>"
_LI_RE = r"(?s)<li[^>]*>(.*?)</li>"


def list_triples(
    docs: DataFrame, url_col: str = "url", html_col: str = "html"
) -> DataFrame:
    """(src_url, subj, pred, obj, pos) from heading-labeled HTML lists — the
    third structured-HTML fact source next to :func:`infobox_triples`
    (column-keyed) and :func:`data_table_triples` (header-keyed): a
    ``<h*>Label</h*>`` heading DIRECTLY followed (whitespace only) by a
    ``<ul>``/``<ol>`` yields one triple per ``<li>`` item with pred =
    ``list:`` + lowercased/underscored label and subj = the page's og:title
    principal entity (url fallback), ``pos`` the 1-based item rank (ordered
    lists carry order as data).

    Documented subset, mirrored by the oracle and unit tests:
    * labels are PLAIN TEXT (``[^<]*`` — a label may not span inner tags;
      this is also what stops the non-greedy match from swallowing an
      unlabeled list under a distant earlier heading);
    * a list without an immediately-preceding heading emits nothing (no
      label evidence — anonymous nav/chrome lists are exactly the ones a
      miner must not guess at);
    * item text is inner-tag-stripped and whitespace-collapsed; empty items
      are dropped; nested lists are out of scope (inner markup strips).

    100 TB shape: label and body arrays come from two regexp_extract_all
    calls over the SAME pattern zipped by index — one narrow JVM projection
    chain (explode of per-page matches), zero shuffle, zero python, fused
    with the page scan by Catalyst.
    """
    text = F.decode(F.col(html_col), "UTF-8")
    subj = F.coalesce(
        F.nullif(_meta_content(text, "property", "og:title"), F.lit("")),
        F.col(url_col),
    )
    pairs = F.arrays_zip(
        F.regexp_extract_all(text, F.lit(_LIST_RE), F.lit(1)),
        F.regexp_extract_all(text, F.lit(_LIST_RE), F.lit(2)),
    )
    lists = docs.select(
        F.col(url_col).alias("src_url"),
        subj.alias("subj"),
        F.explode(pairs).alias("p"),
    )
    label = F.regexp_replace(
        F.trim(F.regexp_replace(F.col("p")["0"], r"\s+", " ")), r"\s", "_"
    )
    items = F.transform(
        F.regexp_extract_all(F.col("p")["1"], F.lit(_LI_RE), F.lit(1)),
        lambda c: _clean_inner(c),
    )
    out = lists.select(
        "src_url",
        "subj",
        F.concat(F.lit("list:"), F.lower(label)).alias("pred"),
        F.posexplode(items).alias("pos0", "obj"),
    )
    return out.select(
        "src_url",
        "subj",
        "pred",
        "obj",
        (F.col("pos0") + 1).cast("int").alias("pos"),
    ).filter((F.col("pred") != "list:") & (F.col("obj") != ""))


def layout_fingerprint_expr(html_col: Column) -> Column:
    """60-bit SimHash of the page's OPENING-TAG BIGRAM stream — a layout
    fingerprint that ignores content entirely: two pages rendered from the
    same template hash identically (or within a few bits once optional
    blocks differ).  Tag bigrams (``div>p``) rather than bags of tags so
    sibling order and nesting transitions count; closing tags are skipped
    (``</`` never matches the opener regex) — they mirror the openers and
    would only dilute the vote.  Pure JVM: one regexp_extract_all + one
    adjacent-zip transform + dedup.simhash64's unrolled bit votes."""
    from aiwhispr_spark.functions.udfs import bound
    from aiwhispr_spark.operators.dedup import simhash64

    tags = F.regexp_extract_all(html_col, F.lit(r"<([a-z][a-z0-9]*)"), F.lit(1))
    bigrams = bound(
        tags,
        lambda t: F.filter(
            F.transform(
                t,
                lambda _, i: F.when(
                    i + 2 <= F.size(t),
                    F.concat(F.element_at(t, i + 1), F.lit(">"), F.element_at(t, i + 2)),
                ),
            ),
            lambda x: x.isNotNull(),
        ),
    )
    return simhash64(F.array_join(bigrams, " "))


def layout_census(
    docs: DataFrame, host_col: str = "host", html_col: str = "html"
) -> DataFrame:
    """(host, layout_hash, n_pages) — per-host template census over the
    layout fingerprint: the table that tells a curation pass which hosts are
    single-template farms (one hash, thousands of pages) vs organic sites,
    and which templates to target for boilerplate rules.  One narrow
    fingerprint projection + one map-side-combinable aggregate."""
    return (
        docs.select(
            F.col(host_col).alias("host"),
            layout_fingerprint_expr(F.col(html_col)).alias("layout_hash"),
        )
        .groupBy("host", "layout_hash")
        .agg(F.count(F.lit(1)).cast("long").alias("n_pages"))
    )


def colist_expansion(
    memberships: DataFrame,
    seeds: list[str],
    list_col: str = "list_id",
    item_col: str = "item",
    min_lists: int = 1,
) -> DataFrame:
    """Entity-set expansion by list co-occurrence (the SEAL/SEISA family,
    Wang & Cohen 2007): given seed entities and (list_id, item) memberships
    — e.g. :func:`list_triples` output keyed on (src_url, pred) — rank every
    NON-seed item by how many distinct lists it shares with at least one
    seed.  Items that keep appearing in the same curated lists as the seeds
    are the candidate members of the seeds' implicit class.

    Returns (item, n_shared_lists, n_lists, support_i) where ``n_lists`` is
    the candidate's total list count and ``support_i = ⌊10^6·shared/total⌋``
    (exact integer division — a candidate appearing ONLY alongside seeds
    scores 1e6).  Filtered to ``n_shared_lists ≥ min_lists``, seeds
    excluded.

    100 TB shape: the seed list is a literal broadcast; seed-bearing list
    ids come from ONE semi-join and stay a set of keys; candidates are a
    second semi-join on those keys; both aggregates are map-side
    combinable groupBys on the item.  No all-pairs item×item join ever
    materializes — the classic co-occurrence blow-up is avoided by keeping
    the LIST as the join key."""
    spark = memberships.sparkSession
    m = memberships.select(
        F.col(list_col).cast("string").alias("list_id"),
        F.col(item_col).cast("string").alias("item"),
    ).distinct()
    seed_df = spark.createDataFrame(
        [(s,) for s in sorted(set(seeds))], "item string"
    )
    seed_lists = m.join(F.broadcast(seed_df), "item", "left_semi").select(
        "list_id"
    ).distinct()
    totals = m.groupBy("item").agg(F.count(F.lit(1)).cast("long").alias("n_lists"))
    shared = (
        m.join(seed_lists, "list_id", "left_semi")
        .join(F.broadcast(seed_df), "item", "left_anti")
        .groupBy("item")
        .agg(F.count(F.lit(1)).cast("long").alias("n_shared_lists"))
        .filter(F.col("n_shared_lists") >= min_lists)
    )
    return shared.join(totals, "item").select(
        "item",
        "n_shared_lists",
        "n_lists",
        F.expr("CAST((1000000 * n_shared_lists) div n_lists AS BIGINT)").alias(
            "support_i"
        ),
    )
