"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship semantic-search query on sf0.001.
``queries()`` exposes one callable per implemented operator family from
SURVEY.md §2 (plus the training-data-pipeline additions); ``oracle_sql()``
gives the DuckDB-equivalent SQL for every SQL-expressible one.

Float discipline: every float-valued output column is emitted as a
``*_i``-suffixed BIGINT = round(value × scale), and every ORDER BY / top-k
boundary orders on the scaled integer with an id tie-break, so Spark and
DuckDB agree bit-for-bit despite differing float summation orders.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from aiwhispr_spark.functions.udfs import (
    clean_text_se_udf,
    clean_text_udf,
    cosine_cols_expr,
    cosine_expr,
    extract_codeblocks_udf,
    strip_punctuation_udf,
    truncate_display_expr,
)
from aiwhispr_spark.kernels import CLEANR_PATTERN, CLEANR_SE_PATTERN
from aiwhispr_spark.operators.textstats import (
    LANG_STOPWORDS,
    bpe_ish_token_count_expr,
    fingerprint_expr,
    lang_id_expr,
    token_count_expr,
)

SF_SMOKE = "/root/testdata/sf0.001"


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _scaled(col, scale: int = 10000):
    return F.round(col * scale).cast("long")


def _esup_europe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EUROPE-region supplier dim (s_suppkey, s_name, n_name, acctbal_ci) —
    the supplier⋈nation⋈region broadcast block shared by the TPC-H q2/q11/
    q20 adaptations; callers project the columns they need."""
    return (
        _t(spark, sf_dir, "supplier")
        .join(
            F.broadcast(_t(spark, sf_dir, "nation")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .join(
            F.broadcast(
                _t(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
            ),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select(
            "s_suppkey",
            "s_name",
            "n_name",
            F.round(F.col("s_acctbal") * 100).cast("long").alias("acctbal_ci"),
        )
    )


# --- the synthesized-HTML wrappers shared by Spark and SQL --------------------------
# (driver `documents.text` is plain words; the T-kernels need HTML-ish input,
#  so both engines wrap the text identically before cleaning)
HTML_WRAP_SPARK = lambda c: F.concat(  # noqa: E731
    F.lit("<p>"), c, F.lit(" &amp; tail&nbsp;&#65; &lt;code&gt marker</p>")
)
HTML_WRAP_SQL = "'<p>' || text || ' &amp; tail&nbsp;&#65; &lt;code&gt marker</p>'"

CODE_WRAP_SPARK = lambda c: F.concat(  # noqa: E731
    F.lit("<code>"), F.substring(c, 1, 24), F.lit("</code> mid <code>x = 1</code>")
)
CODE_WRAP_SQL = "'<code>' || substr(text, 1, 24) || '</code> mid <code>x = 1</code>'"

PUNCT_SUFFIX = " a;b, (c) ~d e'f"

MINHASH_TAIL = " extra trailing words appended here"


def _simhash_terms() -> str:
    """Per-bit majority-vote sum expression over the `hs` token-hash list
    (shared by the fingerprint and pair oracles)."""
    return " + ".join(
        f"CASE WHEN 2 * len(list_filter(hs, h -> ((h >> {i}) & 1) = 1)) > len(hs) "
        f"THEN {1 << i} ELSE 0 END"
        for i in range(60)
    )


def _simhash_sql(where: str) -> str:
    """DuckDB twin of operators.dedup.simhash64 (md5-derived 60-bit SimHash):
    per distinct token h = first 15 md5 hex chars as a 60-bit int; bit i of the
    fingerprint set iff strictly more tokens have bit i set than clear."""
    terms = _simhash_terms()
    return f"""
        WITH t AS (
          SELECT doc_id,
                 list_transform(list_distinct(regexp_split_to_array(trim(text), '\\s+')),
                                w -> ('0x' || substr(md5(w), 1, 15))::BIGINT) AS hs
          FROM documents WHERE {where}
        )
        SELECT doc_id, CAST({terms} AS BIGINT) AS simhash FROM t
    """


def _fixture_path(basename: str, *modules) -> str:
    """Temp-dir cache path whose name embeds an md5 of the generator
    MODULES' source: any edit to the closed form (or anything else in the
    module) changes the path, so a stale cached fixture can never disagree
    with updated oracles — the versioning is automatic instead of the old
    manual suffix-bump discipline."""
    import hashlib
    import inspect
    import os
    import tempfile

    src = "".join(inspect.getsource(m) for m in modules)
    tag = hashlib.md5(src.encode()).hexdigest()[:8]
    root, ext = os.path.splitext(basename)
    return os.path.join(tempfile.gettempdir(), f"{root}_{tag}{ext}")


# unigram-LM tokenizer vocab (piece → integer cost), shared verbatim by the
# Spark query and the DuckDB oracle: 26 single chars cost 10 (full coverage)
# + multi-char pieces priced so merges win on common subwords
_SP_VOCAB = {
    **{chr(c): 10 for c in range(ord("a"), ord("z") + 1)},
    "an": 9, "er": 9, "ig": 9, "ow": 9, "he": 9,
    "ta": 11, "st": 11, "sc": 11,
    "ble": 14, "ter": 13, "row": 16, "art": 13, "ort": 13, "ash": 13,
    "ine": 13, "all": 13, "mer": 13, "tor": 13, "oup": 13,
    "dow": 14, "win": 14, "umn": 14, "atch": 14, "ream": 17,
    "able": 16, "uery": 16, "scan": 15, "table": 18, "value": 20,
    "stream": 22,
}


# WordPiece vocab (BERT-style: ## marks continuation pieces), shared verbatim
# by the Spark query and the DuckDB oracle.  Single chars cover a-z EXCEPT
# initial 'q' (continuations keep all 26), so q-words need the 'qu' merge and
# digit-bearing words go [UNK] — both arms exercised by the corpus.
_WP_VOCAB = sorted(
    {
        *[chr(c) for c in range(ord("a"), ord("z") + 1) if chr(c) != "q"],
        *["##" + chr(c) for c in range(ord("a"), ord("z") + 1)],
        "qu", "data", "dat", "str", "stre", "scan", "sca", "gro", "table",
        "tab", "val", "win", "wind", "sort", "merge", "mer",
        "##ream", "##eam", "##am", "##ta", "##able", "##ble", "##ery",
        "##ry", "##up", "##oup", "##an", "##ue", "##rge",
    }
)


def _ensure_simple_corpus() -> str:
    """Materialize the oracle-friendly KG corpus (idempotent; called from both
    the Spark query and the oracle-SQL builder so file existence never depends
    on the driver's execution order)."""
    import os

    from aiwhispr_spark.sources import synthetic
    from aiwhispr_spark.sources.synthetic import write_simple_corpus_parquet

    path = _fixture_path("aiwhispr_kg_simple_150.parquet", synthetic)
    if not os.path.exists(path):
        write_simple_corpus_parquet(path, n_docs=150)
    return path


def _ensure_simple_corpus_warc() -> str:
    """Shard the simple corpus into 3 gzipped WARC files (idempotent fixture,
    same discipline as _ensure_simple_corpus)."""
    import os

    from aiwhispr_spark.sources import synthetic, warc
    from aiwhispr_spark.sources.warc import write_warc_from_parquet

    out = _fixture_path("aiwhispr_kg_simple_150_warc", synthetic, warc)
    if not os.path.isdir(out) or not os.listdir(out):
        write_warc_from_parquet(_ensure_simple_corpus(), out, n_files=3)
    return out


def _ensure_link_corpus() -> str:
    """Materialize the hyperlinked corpus for the link-graph operators
    (idempotent fixture, same discipline as _ensure_simple_corpus)."""
    import os

    from aiwhispr_spark.sources import synthetic
    from aiwhispr_spark.sources.synthetic import write_linked_corpus_parquet

    path = _fixture_path("aiwhispr_kg_linked_240.parquet", synthetic)
    if not os.path.exists(path):
        write_linked_corpus_parquet(path, n_docs=240)
    return path


def _ensure_bmp_corpus() -> str:
    """Materialize the closed-form BMP fixture (idempotent)."""
    import os

    from aiwhispr_spark.sources import synthetic
    from aiwhispr_spark.operators import multimodal
    from aiwhispr_spark.sources.synthetic import write_bmp_corpus_parquet

    path = _fixture_path("aiwhispr_bmp_24.parquet", synthetic, multimodal)
    if not os.path.exists(path):
        write_bmp_corpus_parquet(path, n_images=24)
    return path


def _ensure_tiff_corpus() -> str:
    """Materialize the closed-form multi-strip TIFF fixture (idempotent)."""
    import os

    from aiwhispr_spark.sources import synthetic
    from aiwhispr_spark.operators import multimodal
    from aiwhispr_spark.sources.synthetic import write_tiff_corpus_parquet

    path = _fixture_path("aiwhispr_tiff_24.parquet", synthetic, multimodal)
    if not os.path.exists(path):
        write_tiff_corpus_parquet(path, n_images=24)
    return path


def _ensure_png_corpus() -> str:
    """Materialize the closed-form filtered-scanline PNG fixture (idempotent)."""
    import os

    from aiwhispr_spark.sources import synthetic
    from aiwhispr_spark.operators import multimodal
    from aiwhispr_spark.sources.synthetic import write_png_corpus_parquet

    path = _fixture_path("aiwhispr_png_24.parquet", synthetic, multimodal)
    if not os.path.exists(path):
        write_png_corpus_parquet(path, n_images=24)
    return path


def _ensure_gif_corpus() -> str:
    """Materialize the closed-form LZW GIF fixture (idempotent)."""
    import os

    from aiwhispr_spark.sources import synthetic
    from aiwhispr_spark.operators import multimodal
    from aiwhispr_spark.sources.synthetic import write_gif_corpus_parquet

    path = _fixture_path("aiwhispr_gif_24.parquet", synthetic, multimodal)
    if not os.path.exists(path):
        write_gif_corpus_parquet(path, n_images=24)
    return path


def _ensure_tracker_corpus() -> str:
    """Materialize the tracker-script page fixture (idempotent)."""
    import os

    from aiwhispr_spark.sources import synthetic
    from aiwhispr_spark.sources.synthetic import write_tracker_corpus_parquet

    path = _fixture_path("aiwhispr_tracker_60.parquet", synthetic)
    if not os.path.exists(path):
        write_tracker_corpus_parquet(path, n_pages=60)
    return path


def _ensure_mediawiki_dump() -> str:
    """Materialize the one-file MediaWiki dump fixture (idempotent)."""
    import os

    from aiwhispr_spark.sources import mediawiki

    path = _fixture_path("aiwhispr_mediawiki_120.xml", mediawiki)
    if not os.path.exists(path):
        mediawiki.write_mediawiki_dump(path, n_pages=120)
    return path


def _ensure_structured_corpus() -> str:
    """Materialize the structured-markup corpus (JSON-LD / meta / infobox)
    for operators/structured.py (idempotent fixture, same discipline as
    _ensure_simple_corpus)."""
    import os

    from aiwhispr_spark.sources import synthetic
    from aiwhispr_spark.sources.synthetic import write_structured_corpus_parquet

    path = _fixture_path("aiwhispr_kg_structured_180.parquet", synthetic)
    if not os.path.exists(path):
        write_structured_corpus_parquet(path, n_docs=180)
    return path


def _structured_facts_sql() -> str:
    """Shared CTE prefix for the structured-corpus oracles: every closed-form
    fact of page ``i`` (synthetic.py::make_structured_doc_html) written
    directly from doc-index arithmetic — independent of the engine's
    script-block regexes, from_json schema, and meta/table parsing."""
    path = _ensure_structured_corpus()
    return f"""
        WITH ids AS (
          SELECT CAST(regexp_extract(url, 'item/(\\d+)$', 1) AS BIGINT) AS i
          FROM read_parquet('{path}')),
        f AS (
          SELECT i,
                 'https://sd' || (i % 8) || '.example.org/item/' || i AS src_url,
                 i % 37 AS a, (5 * i + 2) % 23 AS b, (3 * i + 1) % 11 AS c,
                 (9 * i + 4) % 7 AS d, 1970 + i % 30 AS yr,
                 (7 * i) % 9000 + 10 AS emp,
                 CASE i % 3 WHEN 0 THEN 'organization'
                            WHEN 1 THEN 'article' ELSE 'profile' END AS og_type
          FROM ids),
        ld AS (
          SELECT src_url, 'Entity' || a AS subj, 'rdf:type' AS pred,
                 'organization' AS obj FROM f
          UNION ALL SELECT src_url, 'Entity' || a, 'schema:url',
                 'https://entity' || a || '.example.com' FROM f
          UNION ALL SELECT src_url, 'Entity' || a, 'schema:founder',
                 'Person' || b FROM f
          UNION ALL SELECT src_url, 'Entity' || a, 'schema:foundingDate',
                 yr || '-01-01' FROM f
          UNION ALL SELECT src_url, 'Entity' || a, 'schema:numberOfEmployees',
                 CAST(emp AS VARCHAR) FROM f
          UNION ALL SELECT src_url, 'Person' || b, 'rdf:type', 'person'
                 FROM f WHERE i % 4 = 3
          UNION ALL SELECT src_url, 'Person' || b, 'schema:worksFor',
                 'Entity' || a FROM f WHERE i % 4 = 3),
        box AS (
          SELECT src_url, 'Entity' || a AS subj, 'infobox:headquarters' AS pred,
                 'City' || c AS obj FROM f
          UNION ALL SELECT src_url, 'Entity' || a, 'infobox:industry',
                 'Industry' || d FROM f
          UNION ALL SELECT src_url, 'Entity' || a, 'infobox:founded',
                 CAST(yr AS VARCHAR) FROM f)
    """


def _linked_links_sql(where_i: str = "TRUE") -> str:
    """CLOSED-FORM expected out-links of the linked corpus: every page's three
    kept targets written directly from doc-index arithmetic (synthetic.py::
    make_linked_doc_html) — independent of the engine's extract/resolve/
    canonicalize regexes.  Yields (src_url, dst_url).  ``where_i`` filters on
    the page index (epoch splits)."""
    path = _ensure_link_corpus()
    return f"""
        WITH ids AS (
          SELECT CAST(regexp_extract(url, 'a/(\\d+)$', 1) AS BIGINT) AS i
          FROM read_parquet('{path}')
          WHERE ({where_i})),
        src AS (
          SELECT i, 'https://host' || (i % 12) || '.example.org/a/' || i AS src_url
          FROM ids)
        SELECT src_url,
               'https://host' || (((i * 7 + 1) % 240) % 12) || '.example.org/a/'
                 || ((i * 7 + 1) % 240) AS dst_url FROM src
        UNION ALL
        SELECT src_url,
               'https://host' || (i % 12) || '.example.org/a/'
                 || ((i * 13 + 5) % 240) AS dst_url FROM src
        UNION ALL
        SELECT src_url,
               'https://ext' || (i % 5) || '.example.net/x/' || (i % 3) AS dst_url
        FROM src
    """


def _contact_html(j: int) -> str:
    """Closed-form PII-bearing page ``j`` for the curation fixture (mirrored
    verbatim by the oracle SQL)."""
    return (
        "<html><body>\n<p>Reach ops"
        f"{j}@example.net or 10.9.0.{j * 3} today.</p>\n</body></html>"
    )


def _ensure_curation_warc() -> str:
    """WARC fixture for the end-to-end curation gate: the 150 simple docs
    + 30 exact content mirrors (every 5th doc under a mirror.example.org
    url, so exact-dedup keeper election does real work) + 15 closed-form
    contact pages with real PII (so redaction does real work)."""
    import datetime as dtm
    import os
    import tempfile

    from aiwhispr_spark.sources.warc import write_warc
    from aiwhispr_spark.sources.synthetic import EPOCH0

    from aiwhispr_spark.sources import synthetic as _syn_mod
    from aiwhispr_spark.sources import warc as _warc_mod

    out = _fixture_path(
        "aiwhispr_kg_curation_warc", _syn_mod, _warc_mod, _ensure_curation_warc
    )
    if os.path.isdir(out) and os.listdir(out):
        return out
    import pyarrow.parquet as pq

    tbl = pq.read_table(_ensure_simple_corpus(), columns=["url", "warc_ts", "html"])
    rows = list(
        zip(
            tbl.column("url").to_pylist(),
            tbl.column("warc_ts").to_pylist(),
            tbl.column("html").to_pylist(),
        )
    )
    extra = [
        (
            f"https://mirror.example.org/m/{i}",
            EPOCH0 + dtm.timedelta(seconds=900_000 + 311 * i),
            rows[i][2],
        )
        for i in range(0, len(rows), 5)
    ] + [
        (
            f"https://contact.example.org/c/{j}",
            EPOCH0 + dtm.timedelta(seconds=950_000 + 311 * j),
            _contact_html(j).encode("utf-8"),
        )
        for j in range(15)
    ]
    allrows = rows + extra
    os.makedirs(out, exist_ok=True)
    n_files = 4
    for k in range(n_files):
        write_warc(
            [r for idx, r in enumerate(allrows) if idx % n_files == k],
            os.path.join(out, f"crawl-{k:05d}.warc.gz"),
        )
    return out


def _pagerank_sql(
    iterations: int = 5,
    damping: float = 0.85,
    edges_sql: str | None = None,
    raw: bool = False,
) -> str:
    """DuckDB twin of operators/graph.py::pagerank: the same synchronous
    recurrence UNROLLED (one CTE pair per iteration — dangling mass +
    contribution sum), same double-math formula and association order, so
    round(1e6·pr) hashes identically.  ``edges_sql`` (a SELECT yielding
    src, dst) overrides the default simple-corpus triple-graph edge set."""
    if edges_sql is None:
        parts = [
            f"WITH t AS MATERIALIZED ({_kg_e2e_sql()}),",
            "edges AS MATERIALIZED (SELECT DISTINCT subj AS src, obj AS dst FROM t),",
        ]
    else:
        parts = [f"WITH edges AS MATERIALIZED (SELECT DISTINCT src, dst FROM ({edges_sql})),"]
    parts += [
        "nodes AS MATERIALIZED (SELECT src AS node FROM edges UNION SELECT dst FROM edges),",
        "nn AS MATERIALIZED (SELECT CAST(count(*) AS DOUBLE) AS n FROM nodes),",
        "outd AS MATERIALIZED (SELECT src AS node, CAST(count(*) AS DOUBLE) AS outd"
        " FROM edges GROUP BY src),",
        "pr0 AS MATERIALIZED (SELECT node, 1.0 / (SELECT n FROM nn) AS pr FROM nodes),",
    ]
    for k in range(1, iterations + 1):
        p = f"pr{k - 1}"
        parts.append(
            f"dang{k} AS MATERIALIZED (SELECT coalesce(sum(p.pr), 0) AS dm FROM {p} p"
            f" LEFT JOIN outd o ON o.node = p.node WHERE o.node IS NULL),"
        )
        parts.append(
            f"pr{k} AS ("
            f" SELECT n.node,"
            f"   (1.0 - {damping}) / (SELECT n FROM nn)"
            f"   + {damping} * (coalesce(c.contrib, 0)"
            f"                  + (SELECT dm FROM dang{k}) / (SELECT n FROM nn)) AS pr"
            f" FROM nodes n LEFT JOIN ("
            f"   SELECT e.dst AS node, sum(p.pr / o.outd) AS contrib"
            f"   FROM edges e JOIN {p} p ON p.node = e.src"
            f"   JOIN outd o ON o.node = e.src"
            f"   GROUP BY e.dst) c ON c.node = n.node"
            f"),"
        )
    body = "\n".join(parts).rstrip(",")
    if raw:
        # unscaled doubles — for composition (spam mass joins pr with tr
        # BEFORE scaling so the difference rounds once, not twice)
        return f"{body}\nSELECT node, pr FROM pr{iterations}"
    return f"{body}\nSELECT node, CAST(round(1000000 * pr) AS BIGINT) AS pr_i FROM pr{iterations}"


# TrustRank whitelist for the linked corpus (host_trustrank_seeded) — shared
# by the Spark query and the _trustrank_sql oracle.
_TRUST_SEED_HOSTS = ["host1.example.org", "host4.example.org", "host7.example.org"]


def _trustrank_sql(
    seed_hosts: list[str],
    iterations: int = 5,
    damping: float = 0.85,
    edges_sql: str | None = None,
    raw: bool = False,
) -> str:
    """DuckDB twin of operators/graph.py::personalized_pagerank: the seeded
    recurrence UNROLLED, tele(v) = 1/|S| on seeds else 0, same double-math
    formula and association order as the Spark step
    ((1-d)·tele + d·(contrib + dang·tele)) so round(1e6·pr) hashes
    identically — the _pagerank_sql pattern."""
    assert edges_sql is not None
    seeds_values = ", ".join(f"('{h}')" for h in sorted(set(seed_hosts)))
    parts = [
        f"WITH edges AS MATERIALIZED (SELECT DISTINCT src, dst FROM ({edges_sql})),",
        f"seeds AS MATERIALIZED (SELECT DISTINCT node FROM (VALUES {seeds_values}) s(node)),",
        "nodes AS MATERIALIZED (SELECT src AS node FROM edges"
        " UNION SELECT dst FROM edges UNION SELECT node FROM seeds),",
        "ns AS MATERIALIZED (SELECT CAST(count(*) AS DOUBLE) AS n FROM seeds),",
        "tele AS MATERIALIZED (SELECT n.node,"
        " CASE WHEN s.node IS NOT NULL THEN 1.0 / (SELECT n FROM ns)"
        " ELSE 0.0 END AS t"
        " FROM nodes n LEFT JOIN seeds s ON s.node = n.node),",
        "outd AS MATERIALIZED (SELECT src AS node, CAST(count(*) AS DOUBLE) AS outd"
        " FROM edges GROUP BY src),",
        "pr0 AS MATERIALIZED (SELECT node, t AS pr FROM tele),",
    ]
    for k in range(1, iterations + 1):
        p = f"pr{k - 1}"
        parts.append(
            f"dang{k} AS MATERIALIZED (SELECT coalesce(sum(p.pr), 0) AS dm FROM {p} p"
            f" LEFT JOIN outd o ON o.node = p.node WHERE o.node IS NULL),"
        )
        parts.append(
            f"pr{k} AS ("
            f" SELECT n.node,"
            f"   (1.0 - {damping}) * te.t"
            f"   + {damping} * (coalesce(c.contrib, 0)"
            f"                  + (SELECT dm FROM dang{k}) * te.t) AS pr"
            f" FROM nodes n JOIN tele te ON te.node = n.node"
            f" LEFT JOIN ("
            f"   SELECT e.dst AS node, sum(p.pr / o.outd) AS contrib"
            f"   FROM edges e JOIN {p} p ON p.node = e.src"
            f"   JOIN outd o ON o.node = e.src"
            f"   GROUP BY e.dst) c ON c.node = n.node"
            f"),"
        )
    body = "\n".join(parts).rstrip(",")
    if raw:
        return f"{body}\nSELECT node, pr FROM pr{iterations}"
    return (
        f"{body}\nSELECT node, CAST(round(1000000 * pr) AS BIGINT) AS tr_i"
        f" FROM pr{iterations}"
    )


def _truthfinder_sql(output: str, rounds: int = 3) -> str:
    """DuckDB twin of operators/temporal.py::truthfinder over the
    conflicting-claim fixture: the same integer Sums/Average trust⇄belief
    rounds UNROLLED (belief → group-total → conf '//' → trust '//' per
    round), so every integer matches bit-for-bit."""
    parts = [
        "WITH obs AS (SELECT 'h' || (doc_id % 9) AS host,"
        " 'S' || (doc_id % 20) AS subj, 'ceo_of' AS pred,"
        " CASE WHEN doc_id % 9 < 6 THEN 'P' || ((doc_id % 20) % 5)"
        " ELSE 'Q' || (doc_id % 3) END AS obj FROM documents),",
        "votes AS MATERIALIZED (SELECT DISTINCT host, subj, pred, obj FROM obs),",
        "t0 AS (SELECT DISTINCT host, CAST(1000000 AS BIGINT) AS trust FROM votes),",
    ]
    for k in range(1, rounds + 1):
        parts.append(
            f"b{k} AS (SELECT v.subj, v.pred, v.obj,"
            f" CAST(sum(t.trust) AS BIGINT) AS belief,"
            f" CAST(count(*) AS BIGINT) AS n_hosts"
            f" FROM votes v JOIN t{k - 1} t ON t.host = v.host"
            f" GROUP BY v.subj, v.pred, v.obj),"
        )
        parts.append(
            f"g{k} AS (SELECT subj, pred, CAST(sum(belief) AS BIGINT) AS tot"
            f" FROM b{k} GROUP BY subj, pred),"
        )
        parts.append(
            f"c{k} AS (SELECT b.subj, b.pred, b.obj, b.n_hosts,"
            f" CAST((1000000 * b.belief) // g.tot AS BIGINT) AS conf"
            f" FROM b{k} b JOIN g{k} g ON g.subj = b.subj AND g.pred = b.pred),"
        )
        parts.append(
            f"t{k} AS (SELECT v.host, CAST(count(*) AS BIGINT) AS n_claims,"
            f" CAST(sum(c.conf) // count(*) AS BIGINT) AS trust"
            f" FROM votes v JOIN c{k} c ON c.subj = v.subj"
            f" AND c.pred = v.pred AND c.obj = v.obj"
            f" GROUP BY v.host),"
        )
    body = "\n".join(parts).rstrip(",")
    if output == "facts":
        return (
            f"{body}\nSELECT subj, pred, obj, n_hosts, conf AS conf_i FROM c{rounds}"
        )
    return f"{body}\nSELECT host, n_claims, trust AS trust_i FROM t{rounds}"


def _hits_sql(iterations: int, edges_sql: str) -> str:
    """DuckDB twin of operators/graph.py::hits: the same L1-normalized
    synchronous recurrence UNROLLED (auth-raw → auth-total → auth, then
    hub-raw → hub-total → hub, per iteration), same double-math association,
    so round(1e6·x) hashes identically — the _pagerank_sql pattern."""
    parts = [
        f"WITH edges AS MATERIALIZED (SELECT DISTINCT src, dst FROM ({edges_sql})),",
        "nodes AS MATERIALIZED (SELECT src AS node FROM edges UNION SELECT dst FROM edges),",
        "nn AS MATERIALIZED (SELECT CAST(count(*) AS DOUBLE) AS n FROM nodes),",
        "s0 AS MATERIALIZED (SELECT node, 1.0 / (SELECT n FROM nn) AS hub,"
        " 1.0 / (SELECT n FROM nn) AS auth FROM nodes),",
    ]
    for k in range(1, iterations + 1):
        p = f"s{k - 1}"
        parts.append(
            f"ar{k} AS MATERIALIZED (SELECT n.node, coalesce(x.s, 0) AS auth FROM nodes n"
            f" LEFT JOIN (SELECT e.dst AS node, sum(p.hub) AS s FROM edges e"
            f" JOIN {p} p ON p.node = e.src GROUP BY e.dst) x"
            f" ON x.node = n.node),"
        )
        parts.append(f"at{k} AS MATERIALIZED (SELECT sum(auth) AS t FROM ar{k}),")
        parts.append(
            f"a{k} AS MATERIALIZED (SELECT node, auth / (SELECT t FROM at{k}) AS auth"
            f" FROM ar{k}),"
        )
        parts.append(
            f"hr{k} AS MATERIALIZED (SELECT n.node, coalesce(x.s, 0) AS hub FROM nodes n"
            f" LEFT JOIN (SELECT e.src AS node, sum(p.auth) AS s FROM edges e"
            f" JOIN a{k} p ON p.node = e.dst GROUP BY e.src) x"
            f" ON x.node = n.node),"
        )
        parts.append(f"ht{k} AS MATERIALIZED (SELECT sum(hub) AS t FROM hr{k}),")
        parts.append(
            f"s{k} AS MATERIALIZED (SELECT h.node, h.hub / (SELECT t FROM ht{k}) AS hub,"
            f" a.auth FROM hr{k} h JOIN a{k} a ON a.node = h.node),"
        )
    body = "\n".join(parts).rstrip(",")
    return (
        f"{body}\nSELECT node, CAST(round(1000000 * hub) AS BIGINT) AS hub_i,"
        f" CAST(round(1000000 * auth) AS BIGINT) AS auth_i FROM s{iterations}"
    )


def _ensure_jsonl_corpus() -> str:
    """Materialize the JSONL fixture (idempotent, same discipline as
    _ensure_simple_corpus)."""
    import os
    import tempfile

    from aiwhispr_spark.sources import jsonl
    from aiwhispr_spark.sources.jsonl import write_jsonl_fixture

    path = _fixture_path("aiwhispr_jsonl_300.jsonl", jsonl)
    return write_jsonl_fixture(path)


def _ensure_csv_corpus() -> str:
    """Materialize the CSV fixture (idempotent, same discipline as
    _ensure_jsonl_corpus)."""
    import os
    import tempfile

    from aiwhispr_spark.sources import csvsrc
    from aiwhispr_spark.sources.csvsrc import write_csv_fixture

    path = _fixture_path("aiwhispr_csv_300.csv", csvsrc)
    return write_csv_fixture(path)


def _ensure_robots_corpus() -> str:
    """Materialize the robots.txt compliance fixture (idempotent)."""
    import os
    import tempfile

    from aiwhispr_spark.sources import synthetic
    from aiwhispr_spark.sources.synthetic import write_robots_corpus

    path = _fixture_path("aiwhispr_robots_fixture", synthetic)
    if not os.path.exists(os.path.join(path, "urls.parquet")):
        write_robots_corpus(path)
    return path


def _ensure_charset_corpus() -> str:
    """Materialize the mixed-encoding bytes fixture (idempotent)."""
    import os
    import tempfile

    from aiwhispr_spark.sources import synthetic
    from aiwhispr_spark.sources.synthetic import write_charset_corpus_parquet

    path = _fixture_path("aiwhispr_charset_120.parquet", synthetic)
    if not os.path.exists(path):
        write_charset_corpus_parquet(path)
    return path


def _ensure_wav_corpus() -> str:
    """Materialize the PCM WAV clip fixture (idempotent)."""
    import os
    import tempfile

    from aiwhispr_spark.sources import synthetic
    from aiwhispr_spark.operators import multimodal
    from aiwhispr_spark.sources.synthetic import write_wav_corpus_parquet

    path = _fixture_path("aiwhispr_wav_60.parquet", synthetic, multimodal)
    if not os.path.exists(path):
        write_wav_corpus_parquet(path)
    return path


def _ensure_cdx_fixture() -> str:
    """Materialize the CDX index shard fixture (idempotent)."""
    import os
    import tempfile

    from aiwhispr_spark.sources import synthetic
    from aiwhispr_spark.sources.synthetic import write_cdx_fixture

    path = _fixture_path("aiwhispr_cdx_240.cdx", synthetic)
    if not os.path.exists(path):
        write_cdx_fixture(path)
    return path


def _ensure_sitemap_corpus() -> str:
    """Materialize the sitemap-discovery fixture (idempotent)."""
    import os
    import tempfile

    from aiwhispr_spark.sources import synthetic
    from aiwhispr_spark.sources.synthetic import write_sitemap_corpus

    path = _fixture_path("aiwhispr_sitemap_fixture", synthetic)
    if not os.path.exists(os.path.join(path, "crawlstate.parquet")):
        write_sitemap_corpus(path)
    return path


def _ensure_unicode_corpus() -> str:
    """Materialize the mixed-normalization fixture (idempotent, same
    discipline as _ensure_simple_corpus)."""
    import os
    import tempfile

    from aiwhispr_spark.sources import synthetic
    from aiwhispr_spark.sources.synthetic import write_unicode_corpus_parquet

    path = _fixture_path("aiwhispr_unicode_200.parquet", synthetic)
    if not os.path.exists(path):
        write_unicode_corpus_parquet(path, n_docs=200)
    return path


def _host_edges_sql(where_i: str = "TRUE") -> str:
    """Closed-form cross-host edge set of the linked corpus (src, dst) —
    shared by the host_pagerank_5 / host_hits_5 / host_random_walks oracles.
    ``where_i`` filters on the page index (epoch splits)."""
    return f"""
      WITH l AS ({_linked_links_sql(where_i)}),
      h AS (
        SELECT regexp_extract(src_url, '^[a-z]+://([^/:?#]*)', 1) AS src_host,
               regexp_extract(dst_url, '^[a-z]+://([^/:?#]*)', 1) AS dst_host
        FROM l)
      SELECT src_host AS src, dst_host AS dst FROM h WHERE src_host <> dst_host
    """


def _ppr_push_sql(
    rounds: int, edges_sql: str, seed: str, eps_i: int = 100_000,
    scale: int = 100_000_000,
) -> str:
    """Unrolled DuckDB twin of graph_query.py::ppr_push_bounded — the same
    integer push arithmetic (α=15/100, floor remainders kept in the
    residual) replayed round by round with fresh CTE names."""
    parts = [
        f"WITH edges AS MATERIALIZED (SELECT DISTINCT src, dst FROM ({edges_sql})"
        " WHERE src <> dst),",
        "pdeg AS (SELECT src, CAST(count(*) AS BIGINT) AS d FROM edges GROUP BY 1),",
        f"s0 AS (SELECT '{seed}' AS node, CAST(0 AS BIGINT) AS p,"
        f" CAST({int(scale)} AS BIGINT) AS r),",
    ]
    for k in range(1, rounds + 1):
        parts.append(f"""
        a{k} AS (
          SELECT s.node, s.p, s.r, coalesce(g.d, 0) AS d,
                 CASE WHEN coalesce(g.d, 0) > 0
                       AND s.r > coalesce(g.d, 0) * {int(eps_i)}
                      THEN 1 ELSE 0 END AS act
          FROM s{k - 1} s LEFT JOIN pdeg g ON g.src = s.node),
        upd{k} AS (
          SELECT node,
                 CAST(CASE WHEN act = 1 THEN p + (15 * r) // 100 ELSE p END
                      AS BIGINT) AS p,
                 CAST(CASE WHEN act = 1
                      THEN r - (15 * r) // 100 - (((85 * r) // 100) // d) * d
                      ELSE r END AS BIGINT) AS r
          FROM a{k}),
        snt{k} AS (
          SELECT e.dst AS node,
                 CAST(sum(((85 * a.r) // 100) // a.d) AS BIGINT) AS add_r
          FROM a{k} a JOIN edges e ON e.src = a.node
          WHERE a.act = 1 GROUP BY 1),
        s{k} AS (
          SELECT coalesce(u.node, sn.node) AS node,
                 CAST(coalesce(u.p, 0) AS BIGINT) AS p,
                 CAST(coalesce(u.r, 0) + coalesce(sn.add_r, 0) AS BIGINT) AS r
          FROM upd{k} u FULL JOIN snt{k} sn ON sn.node = u.node),""")
    body = "\n".join(parts).rstrip(",")
    return f"""{body}
        SELECT node, p AS p_i, r AS r_i FROM s{rounds}
        WHERE p > 0 OR r > 0 ORDER BY node
    """


def _simrank_sql(rounds: int, edges_sql: str) -> str:
    """Unrolled integer-exact SimRank recurrence (DuckDB twin of
    graph.py::simrank_bounded): per round, co-in-neighbor pair sums then
    ONE floor division (8·Σ) // (10·|I(a)|·|I(b)|); 0-floor rows drop."""
    parts = [
        f"WITH edges AS MATERIALIZED (SELECT DISTINCT src, dst FROM ({edges_sql})"
        " WHERE src <> dst),",
        "indeg AS (SELECT dst, COUNT(*) AS ind FROM edges GROUP BY dst),",
        "nodes AS (SELECT src AS node FROM edges UNION SELECT dst FROM edges),",
        "s0 AS (SELECT node AS a, node AS b, CAST(1000000 AS BIGINT) AS s FROM nodes),",
    ]
    for r in range(1, rounds + 1):
        parts.append(
            f"u{r} AS (SELECT e1.dst AS a, e2.dst AS b, SUM(p.s) AS t"
            f" FROM s{r - 1} p JOIN edges e1 ON p.a = e1.src"
            f" JOIN edges e2 ON p.b = e2.src GROUP BY 1, 2),"
        )
        parts.append(
            f"s{r} AS MATERIALIZED ("
            " SELECT node AS a, node AS b, CAST(1000000 AS BIGINT) AS s FROM nodes"
            " UNION ALL"
            " SELECT u.a, u.b, CAST((8 * t) // (10 * ia.ind * ib.ind) AS BIGINT)"
            f" FROM u{r} u JOIN indeg ia ON u.a = ia.dst JOIN indeg ib ON u.b = ib.dst"
            " WHERE u.a <> u.b AND (8 * t) // (10 * ia.ind * ib.ind) > 0),"
        )
    parts[-1] = parts[-1].rstrip(",")
    return (
        "\n".join(parts)
        + f"\nSELECT a, b, s AS simrank_i FROM s{rounds} WHERE a < b AND s > 0"
    )


def _minhop_parts(edges_sql: str, hops: int) -> list[str]:
    """Shared unrolled bounded-min-hop CTE chain (d1..d{hops}) over a
    (src, dst) edge query — the DuckDB twin of graph_query.py::
    transitive_closure, used by the harmonic / eccentricity / stress
    oracles.  Returns WITH-clause parts ending in a trailing comma."""
    parts = [
        f"WITH edges AS MATERIALIZED (SELECT DISTINCT src, dst"
        f" FROM ({edges_sql}) WHERE src <> dst),",
        "d1 AS (SELECT src, dst, CAST(1 AS BIGINT) AS d FROM edges),",
    ]
    for hk in range(2, hops + 1):
        parts.append(
            f"d{hk} AS MATERIALIZED (SELECT src, dst, min(d) AS d FROM ("
            f" SELECT src, dst, d FROM d{hk - 1}"
            f" UNION ALL SELECT p.src, e.dst, p.d + 1 FROM d{hk - 1} p"
            f" JOIN edges e ON e.src = p.dst) GROUP BY src, dst),"
        )
    return parts


def _stress_sql(edges_sql: str, hops: int) -> str:
    """DuckDB twin of graph_query.py::stress_centrality: the min-hop chain
    plus one σ CTE per level (hop-synchronous shortest-path counting) and
    the through-v join — all BIGINT."""
    parts = _minhop_parts(edges_sql, hops)
    parts.append(f"dist AS MATERIALIZED (SELECT src, dst, d FROM d{hops}),")
    parts.append(
        "s1 AS MATERIALIZED (SELECT e.src, e.dst, CAST(1 AS BIGINT) AS sigma"
        " FROM edges e JOIN dist ON dist.src = e.src AND dist.dst = e.dst"
        " AND dist.d = 1),"
    )
    for hk in range(2, hops + 1):
        parts.append(
            f"s{hk} AS MATERIALIZED (SELECT p.src, e.dst,"
            f" CAST(sum(p.sigma) AS BIGINT) AS sigma"
            f" FROM s{hk - 1} p JOIN edges e ON e.src = p.dst"
            f" JOIN dist ON dist.src = p.src AND dist.dst = e.dst"
            f" AND dist.d = {hk}"
            f" GROUP BY p.src, e.dst),"
        )
    sig_union = "\nUNION ALL ".join(
        f"SELECT src, dst, sigma, CAST({hk} AS BIGINT) AS d FROM s{hk}"
        for hk in range(1, hops + 1)
    )
    parts.append(f"sig AS MATERIALIZED ({sig_union})")
    body = "\n".join(parts)
    return f"""{body}
        SELECT x.v AS node,
               CAST(sum(x.sigma_sv * x.sigma_vt) AS BIGINT) AS stress
        FROM (
          SELECT sv.src AS s, sv.dst AS v, vt.dst AS t,
                 sv.sigma AS sigma_sv, vt.sigma AS sigma_vt,
                 sv.d AS d_sv, vt.d AS d_vt
          FROM sig sv JOIN sig vt ON vt.src = sv.dst) x
        JOIN dist ON dist.src = x.s AND dist.dst = x.t
        WHERE x.s <> x.t AND x.s <> x.v AND x.t <> x.v
          AND x.d_sv + x.d_vt = dist.d
        GROUP BY x.v
    """


def _walks_sql(length: int, edges_sql: str) -> str:
    """DuckDB twin of operators/graph.py::deterministic_walks: per-node
    sorted neighbor lists, md5-derandomized step pick, one MATERIALIZED CTE
    per step (the CTE-inlining discipline), steps emitted via UNION ALL."""
    parts = [
        f"WITH edges AS MATERIALIZED (SELECT DISTINCT src, dst FROM ({edges_sql})),",
        "nbr AS MATERIALIZED (SELECT src, list_sort(list(dst)) AS nbrs,"
        " count(*) AS nd FROM edges GROUP BY src),",
        "s0 AS MATERIALIZED (SELECT node AS start, node AS cur FROM"
        " (SELECT src AS node FROM edges UNION SELECT dst FROM edges)),",
    ]
    for t in range(1, length + 1):
        parts.append(
            f"s{t} AS MATERIALIZED (SELECT s.start,"
            f" n.nbrs[CAST(('0x' || substr(md5(s.cur || ':{t}'), 1, 8))::BIGINT"
            f" % n.nd AS INT) + 1] AS cur"
            f" FROM s{t - 1} s JOIN nbr n ON n.src = s.cur),"
        )
    body = "\n".join(parts).rstrip(",")
    selects = ["SELECT start, CAST(0 AS BIGINT) AS step, cur AS node FROM s0"]
    for t in range(1, length + 1):
        selects.append(
            f"SELECT start, CAST({t} AS BIGINT) AS step, cur AS node FROM s{t}"
        )
    return body + "\n" + "\nUNION ALL ".join(selects)


# appended to every third document by the duplicate_ngram_spans fixture
# (leading space: concatenates cleanly onto the doc text in both engines)
_DUP_SPAN_SENTENCE = " shared boilerplate sentence for duplicate span detection here"


def _kcore_fixture_edges() -> list[tuple[int, int]]:
    """Shared k-core fixture: clique K6 (0–5, the 2-core survivor), a pendant
    path 5–6–…–10 (peels exactly one node per round — exercises 5 peel
    rounds), a 4-cycle 20–23 (survives), an isolated edge 30–31 (both
    endpoints doomed in the SAME round), and a duplicate + self-loop edge
    (input hygiene)."""
    edges = [(a, b) for a in range(6) for b in range(a + 1, 6)]
    edges += [(i, i + 1) for i in range(5, 10)]
    edges += [(20, 21), (21, 22), (22, 23), (23, 20)]
    edges += [(30, 31), (0, 1), (7, 7)]
    return edges


def _bowtie_fixture_edges() -> list[tuple[str, str]]:
    """Shared bowtie fixture (Broder web-structure classes, hand-derived):
    CORE = the 4-cycle c0→c1→c2→c3→c0 with chord c1→c3 (largest SCC);
    IN = i1→i0→c0; OUT = c0→o0→o1 plus the SMALLER 2-node SCC o2↔o3 hanging
    off c3 (a non-core SCC must land in OUT, pinning the largest-SCC
    election); TENDRILS = t0→t3 off the IN chain (reach nothing core-ward)
    and t1→o1 (Broder's tube-ish: feeds OUT, never reaches CORE);
    DISCONNECTED = the 2-node SCC d0↔d1 and the isolated edge d2→d3.
    A self-loop c0→c0 and a duplicate c0→c1 exercise input hygiene."""
    return [
        ("c0", "c1"), ("c1", "c2"), ("c2", "c3"), ("c3", "c0"), ("c1", "c3"),
        ("i1", "i0"), ("i0", "c0"),
        ("c0", "o0"), ("o0", "o1"),
        ("c3", "o2"), ("o2", "o3"), ("o3", "o2"),
        ("i0", "t0"), ("t0", "t3"),
        ("t1", "o1"),
        ("d0", "d1"), ("d1", "d0"), ("d2", "d3"),
        ("c0", "c0"), ("c0", "c1"),
    ]


_BOWTIE_EXPECTED = {
    "CORE": ["c0", "c1", "c2", "c3"],
    "OUT": ["o0", "o1", "o2", "o3"],
    "IN": ["i0", "i1"],
    "TENDRIL": ["t0", "t1", "t3"],
    "DISCONNECTED": ["d0", "d1", "d2", "d3"],
}


def _kcore_sql(k: int, rounds: int) -> str:
    """DuckDB twin of operators/graph.py::kcore over the shared fixture: the
    peel loop UNROLLED to ``rounds`` rounds (one degree/doom/live CTE triple
    per round; rounds past the fixed point are no-ops because NOT IN over an
    empty doom set keeps everything)."""
    vals = ", ".join(f"({a}, {b})" for a, b in _kcore_fixture_edges())
    parts = [
        f"WITH raw(a, b) AS (VALUES {vals}),",
        "und AS MATERIALIZED (SELECT a, b FROM raw WHERE a <> b"
        " UNION SELECT b, a FROM raw WHERE a <> b),",
        "live0 AS MATERIALIZED (SELECT a, b FROM und),",
    ]
    for r in range(1, rounds + 1):
        p = f"live{r - 1}"
        parts.append(
            f"deg{r} AS MATERIALIZED (SELECT a, count(*) AS d FROM {p} GROUP BY a),"
        )
        parts.append(f"doom{r} AS MATERIALIZED (SELECT a FROM deg{r} WHERE d < {k}),")
        parts.append(
            f"live{r} AS MATERIALIZED (SELECT l.a, l.b FROM {p} l"
            f" WHERE l.a NOT IN (SELECT a FROM doom{r})"
            f" AND l.b NOT IN (SELECT a FROM doom{r})),"
        )
    body = "\n".join(parts).rstrip(",")
    return (
        f"{body}\nSELECT CAST(a AS BIGINT) AS node,"
        f" CAST(count(*) AS BIGINT) AS degree FROM live{rounds} GROUP BY a"
    )


def _kg_e2e_sql() -> str:
    """DuckDB twin of the full E1→E2→E3 pipeline over the simple corpus.

    Stage-by-stage closed forms (valid because make_simple_doc_html constrains
    the input — ASCII, English, < 700 words/doc):
    * E1 T1 clean  — regexp_replace(decode(html), CLEANR, '', 'g');
    * roundtrip    — identity on ASCII;
    * C1 chunker   — whole-line fill only ⇒ ONE chunk per doc:
                     concat over nonblank lines of (' ' || rstrip(line));
    * T5 validator — every sentence is English ⇒ reduces to deleting each
                     whitespace run after [.!?] (the sentence splitter's
                     separators; survivors concat with no separator);
    * E3 kernel    — validated text has no post-punct whitespace, so the
                     sentence splitter yields ONE span and per-sentence
                     finditer equals whole-text regexp_extract_all (mentions
                     cannot contain '.', so no cross-boundary matches).
    """
    from aiwhispr_spark.triples import _PATTERNS

    path = _ensure_simple_corpus()
    parts = []
    for pattern, pred in _PATTERNS:
        rx = pattern.pattern
        parts.append(
            f"SELECT url, CAST(1 AS INT) AS chunk_no, "
            f"regexp_extract(m, '^{rx}$', 1) AS subj, '{pred}' AS pred, "
            f"rtrim(regexp_extract(m, '^{rx}$', 2), '.') AS obj "
            f"FROM (SELECT url, unnest(regexp_extract_all(v, '{rx}')) AS m FROM validated)"
        )
    return (
        f"""
        WITH raw AS (SELECT url, decode(html) AS h FROM read_parquet('{path}')),
        cleaned AS (
          SELECT url, regexp_replace(h, '{CLEANR_PATTERN}', '', 'g') AS txt FROM raw
        ),
        lines AS (
          SELECT url, rtrim(l, concat(' ', chr(9), chr(13))) AS line, ord FROM (
            SELECT url, unnest(string_split(txt, chr(10))) AS l,
                   generate_subscripts(string_split(txt, chr(10)), 1) AS ord
            FROM cleaned
          )
        ),
        chunked AS (
          SELECT url, string_agg(' ' || line, '' ORDER BY ord) AS chunk
          FROM lines WHERE line <> '' GROUP BY url
        ),
        validated AS (
          SELECT url, regexp_replace(chunk, '([.!?])\\s+', '\\1', 'g') AS v FROM chunked
        )
        """
        + "\nUNION ALL\n".join(parts)
    )


def _multimodal_sql() -> str:
    """DuckDB twin of the multimodal byte-bucket feature: payload = utf-8 bytes
    of the ASCII-sanitized text, so per-CHAR counts equal per-BYTE counts;
    bucket b counts chars in [16b, 16b+15].  Buckets outside printable ASCII
    are structurally zero (the sanitizer removed those bytes)."""
    cases = []
    for b in range(16):
        lo, hi = 16 * b, 16 * b + 15
        if hi < 0x20 or lo > 0x7E:
            cases.append(f"WHEN {b} THEN 0")
        else:
            cls = f"[\\x{lo:02x}-\\x{hi:02x}]"
            cases.append(
                f"WHEN {b} THEN length(t) - length(regexp_replace(t, '{cls}', '', 'g'))"
            )
    case_expr = "CASE b.bucket " + " ".join(cases) + " ELSE 0 END"
    return f"""
        WITH src AS (
          SELECT CAST(doc_id AS VARCHAR) AS media_id,
                 regexp_replace(text, '[^ -~]', '', 'g') AS t
          FROM documents WHERE doc_id < 200
        )
        SELECT media_id, CAST(b.bucket AS INT) AS bucket,
               CAST({case_expr} AS BIGINT) AS cnt,
               CAST(length(t) AS INT) AS n_bytes
        FROM src, (SELECT unnest(generate_series(0, 15)) AS bucket) b
    """


T5_TAIL = (
    ". Der schnelle Fuchs springt über den faulen Hund und die Daten sind groß."
    " The end is here."
)


def _t5_sql() -> str:
    """DuckDB twin of kernels.validate_text_chunk (T5/T6).  The Python
    lookbehind sentence split ``(?<=[.!?])\\s+`` is emulated (RE2 has no
    lookbehind) by rewriting 'punct + whitespace-run' to 'punct + US-marker'
    and splitting on the marker — byte-equivalent on ASCII whitespace.
    Per-sentence detection mirrors detect_sentence_lang exactly: multiplicity
    stopword counts over strip('.,;:!?\"'()[]{}')+lower words, best=0 → en,
    en-wins-ties, then de < es < fr.  Kept sentences concat with NO separator
    in order (T6 encoding fix is identity on the kept ASCII sentences)."""
    from aiwhispr_spark.kernels import STOPWORDS

    def stoplist(lang: str) -> str:
        return "[" + ", ".join(f"'{w}'" for w in sorted(STOPWORDS[lang])) + "]"

    strip_chars = ".,;:!?\"''()[]{}"  # '' = escaped single quote in SQL
    scores = ", ".join(
        f"len(list_filter(words, w -> list_contains({stoplist(lang)}, w))) AS s_{lang}"
        for lang in ("en", "de", "fr", "es")
    )
    return f"""
        WITH src AS (
          SELECT doc_id, text || '{T5_TAIL}' AS t
          FROM documents WHERE doc_id < 300
        ),
        marked AS (
          SELECT doc_id, regexp_replace(t, '([.!?])(\\s+)', '\\1' || chr(30), 'g') AS m
          FROM src
        ),
        sents AS (
          SELECT doc_id, s, ord FROM (
            SELECT doc_id, unnest(string_split(m, chr(30))) AS s,
                   generate_subscripts(string_split(m, chr(30)), 1) AS ord
            FROM marked
          ) WHERE s <> ''
        ),
        tokenized AS (
          SELECT doc_id, s, ord,
                 list_transform(list_filter(regexp_split_to_array(s, '\\s+'), x -> x <> ''),
                                w -> trim(lower(w), '{strip_chars}')) AS words
          FROM sents
        ),
        scored AS (SELECT doc_id, s, ord, {scores} FROM tokenized),
        decided AS (
          SELECT doc_id, s, ord, greatest(s_en, s_de, s_fr, s_es) AS best, s_en
          FROM scored
        )
        SELECT doc_id,
               coalesce(string_agg(CASE WHEN best = 0 OR s_en = best THEN s END,
                                   '' ORDER BY ord), '') AS validated
        FROM decided GROUP BY doc_id
    """


def _kmeans_sql(k: int = 8, iterations: int = 2, dim: int = 64, scale: int = 1000) -> str:
    """DuckDB twin of operators/clustering.py::kmeans_lloyd — the identical
    INTEGER-EXACT Lloyd rounds unrolled as chained CTEs (quantized grid,
    exact integer squared-L2, lowest-id init, round-half-up centroid means,
    empty clusters keep the previous centroid)."""
    d1 = dim + 1

    def assign(a: str, c: str) -> str:
        return f"""{a} AS (
          SELECT id, cid, dist FROM (
            SELECT d.id, d.cid, d.dist,
                   row_number() OVER (PARTITION BY d.id
                                      ORDER BY d.dist, d.cid) AS rn
            FROM (
              SELECT p.id, c.cid,
                     CAST(list_sum(list_transform(range(1, {d1}),
                       i -> (p.qv[i] - c.c[i]) * (p.qv[i] - c.c[i])))
                       AS BIGINT) AS dist
              FROM pts p CROSS JOIN {c} c
            ) d
          ) WHERE rn = 1
        )"""

    def update(a: str, c_old: str, c_new: str) -> str:
        return f"""{c_new} AS (
          SELECT co.cid, coalesce(nc.c, co.c) AS c
          FROM {c_old} co LEFT JOIN (
            SELECT cid, list(cv ORDER BY i) AS c FROM (
              SELECT a.cid, g.i,
                     CAST(floor(CAST(sum(p.qv[g.i]) AS DOUBLE) / count(*) + 0.5)
                          AS BIGINT) AS cv
              FROM {a} a JOIN pts p USING (id)
              CROSS JOIN (SELECT unnest(range(1, {d1})) AS i) g
              GROUP BY a.cid, g.i
            ) GROUP BY cid
          ) nc USING (cid)
        )"""

    ctes = [
        f"""pts AS (
          SELECT vec_id AS id,
                 list_transform(embedding,
                   x -> CAST(floor(CAST(x AS DOUBLE) * {scale}.0 + 0.5) AS BIGINT)) AS qv
          FROM embeddings
        )""",
        f"""c0 AS (
          SELECT CAST(row_number() OVER (ORDER BY id) - 1 AS BIGINT) AS cid, qv AS c
          FROM (SELECT id, qv FROM pts ORDER BY id LIMIT {k})
        )""",
    ]
    for t in range(iterations):
        ctes.append(assign(f"a{t}", f"c{t}"))
        ctes.append(update(f"a{t}", f"c{t}", f"c{t + 1}"))
    ctes.append(assign(f"a{iterations}", f"c{iterations}"))
    return (
        "WITH " + ",\n".join(ctes) + f"\nSELECT id AS vec_id, cid, dist AS dist_l FROM a{iterations}"
    )


def _e3_sql() -> str:
    """DuckDB twin of the E3 pattern kernel over the inline SVO construction.
    Patterns are taken from triples._PATTERNS verbatim (RE2-compatible: no
    lookarounds/backrefs); matches cannot span sentence boundaries ('.' is
    not a mention character), so whole-text extract_all equals the kernel's
    per-sentence finditer."""
    from aiwhispr_spark.triples import _PATTERNS

    base = (
        "SELECT 'u' || doc_id AS url, "
        "'Entity_' || (doc_id % 37) || ' acquired E' || (doc_id % 11) || "
        "' Corp. Entity_' || (doc_id % 37) || ' is based in Berlin. "
        "Ada Byron works for Entity_' || (doc_id % 5) || '. plain tail words.' AS t "
        "FROM documents"
    )
    parts = []
    for pattern, pred in _PATTERNS:
        rx = pattern.pattern
        parts.append(
            f"SELECT url, regexp_extract(m, '^{rx}$', 1) AS subj, '{pred}' AS pred, "
            f"rtrim(regexp_extract(m, '^{rx}$', 2), '.') AS obj "
            f"FROM (SELECT url, unnest(regexp_extract_all(t, '{rx}')) AS m FROM c)"
        )
    return "WITH c AS (" + base + ")\n" + "\nUNION ALL\n".join(parts)


def _minhash_cte(bands: int = 8, rows_per_band: int = 2, max_doc: int = 300) -> str:
    """Shared CTE chain (corpus augmentation → shingles → md5 minhash
    signatures → banding → verified pairs ≥ 0.5) for the minhash oracles."""
    n = bands * rows_per_band
    mh = ",\n                 ".join(
        f"list_min(list_transform(sh, s -> ('0x' || substr(md5(s || ':{i}'), 1, 15))::BIGINT)) AS mh{i}"
        for i in range(n)
    )
    band_rows = "\n          UNION ALL ".join(
        f"SELECT id, {b} AS band, md5("
        + " || '|' || ".join(f"mh{b * rows_per_band + r}::VARCHAR" for r in range(rows_per_band))
        + ") AS bhash FROM sig"
        for b in range(bands)
    )
    jac = "len(list_intersect(la.sh, lb.sh))::DOUBLE / len(list_distinct(la.sh || lb.sh))"
    return f"""
        d0 AS (SELECT doc_id, text FROM documents WHERE doc_id < {max_doc}),
        alld AS (
          SELECT doc_id, text FROM d0
          UNION ALL
          SELECT doc_id + 10000, text || '{MINHASH_TAIL}' FROM d0
        ),
        toks AS (SELECT doc_id AS id, regexp_split_to_array(trim(text), '\\s+') AS t FROM alld),
        base AS (
          SELECT id,
                 list_distinct(list_transform(generate_series(1, len(t) - 2),
                               i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS sh
          FROM toks WHERE len(t) >= 3
        ),
        sig AS (
          SELECT id, sh,
                 {mh}
          FROM base
        ),
        banded AS (
          {band_rows}
        ),
        cand AS (
          SELECT DISTINCT l.id AS a, r.id AS b
          FROM banded l JOIN banded r
            ON l.band = r.band AND l.bhash = r.bhash AND l.id < r.id
        ),
        pairs AS (
          SELECT c.a, c.b, CAST(round(10000 * ({jac})) AS BIGINT) AS jaccard_i
          FROM cand c
          JOIN base la ON la.id = c.a
          JOIN base lb ON lb.id = c.b
          WHERE {jac} >= 0.5
        )
    """


def _minhash_sql() -> str:
    """DuckDB twin of operators.dedup.minhash_lsh_pairs_md5 over the augmented
    (original ∪ perturbed-copy) corpus used by the minhash_pairs_md5 query."""
    return "WITH " + _minhash_cte() + "\nSELECT a, b, jaccard_i FROM pairs"


def _minhash_keepers_sql() -> str:
    """Survivor set of the full dedup-group pipeline (groups oracle + the
    keeper filter — the applied form every dedup consumer runs)."""
    return (
        "WITH RECURSIVE "
        + _minhash_cte()
        + """,
        edges AS (SELECT a AS u, b AS v FROM pairs UNION SELECT b, a FROM pairs),
        ids AS (SELECT doc_id AS id FROM alld),
        enodes AS (SELECT DISTINCT u AS node FROM edges),
        reach(node, root) AS (
          SELECT node, node FROM enodes
          UNION
          SELECT e.v, r.root FROM reach r JOIN edges e ON e.u = r.node
        ),
        comp AS (SELECT node, min(root) AS keep FROM reach GROUP BY node)
        SELECT i.id
        FROM ids i LEFT JOIN comp c ON c.node = i.id
        WHERE coalesce(c.keep, i.id) = i.id
    """
    )


def _minhash_groups_sql() -> str:
    """Full dedup-group oracle: md5 banding pairs + recursive transitive
    closure electing min-id keepers (the SQL twin of minhash pairs →
    connected_components → keep_id)."""
    return (
        "WITH RECURSIVE "
        + _minhash_cte()
        + """,
        edges AS (SELECT a AS u, b AS v FROM pairs UNION SELECT b, a FROM pairs),
        ids AS (SELECT doc_id AS id FROM alld),
        enodes AS (SELECT DISTINCT u AS node FROM edges),
        reach(node, root) AS (
          SELECT node, node FROM enodes
          UNION
          SELECT e.v, r.root FROM reach r JOIN edges e ON e.u = r.node
        ),
        comp AS (SELECT node, min(root) AS keep FROM reach GROUP BY node)
        SELECT i.id, coalesce(c.keep, i.id) AS keep_id
        FROM ids i LEFT JOIN comp c ON c.node = i.id
    """
    )


def _punct_strip_sql(var: str = "w") -> str:
    """DuckDB replace-chain equivalent of kernels.remove_punctuations_word."""
    expr = var
    for ch in ";,'-:\"#!@%&*()[]{}?+`|^~":
        lit = "''" if ch == "'" else ch
        repl = " " if ch == "~" else ""
        expr = f"replace({expr}, '{lit}', '{repl}')"
    return expr


def _stop_array_sql(lang: str) -> str:
    return "[" + ", ".join(f"'{w}'" for w in LANG_STOPWORDS[lang]) + "]"


# --- flagship -------------------------------------------------------------------------


def _flagship(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q1/Q2/Q3/Q8: exact top-25 cosine search for the vec_id=0 query vector,
    with distance / angle / rank-tier columns (the reference's full search
    result shape; cites searchService.py:73-97, 6_Semantic_Search.py:137-142,
    370-418)."""
    emb = _t(spark, sf_dir, "embeddings")
    qvec = [float(x) for x in emb.filter(F.col("vec_id") == 0).first()["embedding"]]
    scored = emb.withColumn("score_i", _scaled(cosine_expr("embedding", qvec)))
    top = scored.orderBy(F.col("score_i").desc(), F.col("vec_id")).limit(25)
    w = Window.orderBy(F.col("score_i").desc(), F.col("vec_id"))
    rank = F.row_number().over(w)
    dist = F.lit(1.0) - F.col("score_i") / 10000.0
    return top.select(
        "vec_id",
        "score_i",
        _scaled(dist).alias("distance_i"),
        _scaled(F.acos(F.least(dist, F.lit(1.0)))).alias("angle_i"),
        F.when(rank <= 5, "blue").when(rank <= 10, "orange").otherwise("red").alias("tier"),
    )


FLAGSHIP_SQL = """
WITH q AS (SELECT embedding e FROM embeddings WHERE vec_id = 0),
scored AS (
  SELECT vec_id,
         CAST(round(10000 * list_dot_product(embedding::DOUBLE[], (SELECT e FROM q)::DOUBLE[])
           / (sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]))
              * sqrt(list_dot_product((SELECT e FROM q)::DOUBLE[], (SELECT e FROM q)::DOUBLE[])))) AS BIGINT) AS score_i
  FROM embeddings
),
top AS (SELECT * FROM scored ORDER BY score_i DESC, vec_id LIMIT 25),
ranked AS (SELECT *, row_number() OVER (ORDER BY score_i DESC, vec_id) AS rnk FROM top)
SELECT vec_id, score_i,
       CAST(round(10000 * (1.0 - score_i / 10000.0)) AS BIGINT) AS distance_i,
       CAST(round(10000 * acos(least(1.0 - score_i / 10000.0, 1.0))) AS BIGINT) AS angle_i,
       CASE WHEN rnk <= 5 THEN 'blue' WHEN rnk <= 10 THEN 'orange' ELSE 'red' END AS tier
FROM ranked
"""


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return _flagship(spark, SF_SMOKE)


# --- queries --------------------------------------------------------------------------


def _winnow_sql(k: int = 8, w: int = 4) -> str:
    """DuckDB twin of operators/fingerprint.py::winnow_fingerprints: the same
    normalize -> 60-bit md5-prefix k-gram hashes -> per-window min with
    RIGHTMOST tie-break, yielding CTE ``fps(doc_id, fp, pos)``.  Validated
    against an independent python reference implementation of the paper."""
    return f"""
        s AS (SELECT doc_id, regexp_replace(lower(text), '[^a-z0-9]', '', 'g') AS t
              FROM documents),
        g AS (SELECT doc_id, t, length(t) - {k - 1} AS n FROM s),
        h AS (
          SELECT doc_id, n,
                 list_transform(generate_series(1, n),
                    i -> ('0x' || substr(md5(substr(t, i, {k})), 1, 15))::BIGINT) AS hs
          FROM g WHERE n - {w - 1} >= 1
        ),
        w AS (
          SELECT doc_id,
                 unnest(list_transform(generate_series(1, n - {w - 1}), j ->
                   struct_pack(fp := list_min(hs[j:j+{w - 1}]),
                               pos := list_max(list_transform(generate_series(j, j+{w - 1}),
                                      p -> CASE WHEN hs[p] = list_min(hs[j:j+{w - 1}])
                                           THEN p END))))) AS sel
          FROM h
        ),
        fps AS (SELECT DISTINCT doc_id, sel.fp AS fp, CAST(sel.pos AS INT) AS pos FROM w)
    """


# controlled vocabulary for the gazetteer tagger — bigram surfaces overlap
# the unigram ones on purpose ('hash' inside 'table hash', 'customer' inside
# 'customer join') so the longest-match coverage cut is load-bearing
_GAZETTEER = [
    ("table hash", "STRUCT"),
    ("merge group", "OP"),
    ("customer join", "OP"),
    ("big order", "BIZ"),
    ("hash", "ALGO"),
    ("spark", "SYS"),
    ("customer", "BIZ"),
    ("vector", "DS"),
    ("order", "BIZ"),
]


def _gazetteer_values_sql() -> str:
    return ", ".join(f"('{s}', '{t}')" for s, t in _GAZETTEER)


def _bellman_sql(iterations: int, edges_sql: str) -> str:
    """DuckDB twin of operators/graph.py::bounded_shortest_paths: the same
    synchronous Bellman-Ford relaxation UNROLLED (one carry-over + relax +
    min-agg CTE per round), md5-derived integer weights, seed = min node."""
    parts = [
        "WITH edges AS MATERIALIZED (",
        "  SELECT src, dst, min(w) AS w FROM (",
        "    SELECT src, dst,",
        "           1 + ('0x' || substr(md5(src || '>' || dst), 1, 2))::BIGINT % 5 AS w",
        f"    FROM ({edges_sql})) GROUP BY src, dst),",
        "nodes AS (SELECT src AS node FROM edges UNION SELECT dst FROM edges),",
        "seed AS MATERIALIZED (SELECT src AS s FROM edges GROUP BY src"
    " ORDER BY count(*) DESC, src LIMIT 1),",
        "d0 AS (SELECT (SELECT s FROM seed) AS node, CAST(0 AS BIGINT) AS cost),",
    ]
    for k in range(1, iterations + 1):
        p = f"d{k - 1}"
        parts.append(
            f"d{k} AS MATERIALIZED (SELECT node, min(cost) AS cost FROM ("
            f" SELECT node, cost FROM {p}"
            f" UNION ALL SELECT e.dst, d.cost + e.w FROM {p} d"
            f" JOIN edges e ON e.src = d.node) GROUP BY node),"
        )
    body = "\n".join(parts).rstrip(",")
    return f"{body}\nSELECT node, CAST(cost AS BIGINT) AS cost_l FROM d{iterations}"


def _kept_tokens_sql() -> str:
    """DuckDB twin of operators/keywords.py::kept_tokens_expr — content-word
    token list per document ([a-z]{3,}, non-stopword)."""
    return (
        "list_filter(regexp_split_to_array(lower(trim(text)), '\\s+'), "
        "x -> regexp_matches(x, '^[a-z]{3,}$') "
        f"AND NOT list_contains({_stop_array_sql('en')}, x))"
    )


def _cooc_edges_sql() -> str:
    """DuckDB twin of keywords.py::cooccurrence_edges: consecutive
    content-word pairs, a<>b, both directions (dedup is _pagerank_sql's)."""
    return f"""
        WITH tk AS (SELECT {_kept_tokens_sql()} AS t FROM documents),
        pr AS (SELECT unnest(list_transform(generate_series(1, len(t) - 1),
                     i -> struct_pack(a := t[i], b := t[i + 1]))) AS p
               FROM tk WHERE len(t) >= 2)
        SELECT p.a AS src, p.b AS dst FROM pr WHERE p.a <> p.b
        UNION ALL
        SELECT p.b AS src, p.a AS dst FROM pr WHERE p.a <> p.b
    """


# Risk-ranked registration order: the driver's CORRECTNESS gate hashes only
# the FIRST 50 entries, so composition / scale-path / novel-operator
# queries lead and each round rotates in queries with no prior driver row
# (r5 first-50: 2 anchors — the r4 red-row line_dedup_boilerplate and the
# warc_roundtrip_extract composition — + the new knn_graph_lsh_tier_search
# + 4 brand-new late-r5 gates (bitext_margin_mine and the tpch q8/q17/q21
# adaptations, riskiest because their oracles have never run anywhere)
# + 43 never-driver-checked promotions; displaced to 51+ and covered by
# the full-sweep tier: ccnet_perplexity_buckets, funnel_conversion,
# retention_cohorts, conversion_attribution, event_markov_transitions,
# plus the milder new tpch q7/q11/q15/q16; the r4 tranche keeps its rows
# and shifts further down).
# tests/test_query_placement.py enforces that every registered query is
# either here or in QUERY_DEMOTIONS.
QUERY_RISK_ORDER: list[str] = [
    "line_dedup_boilerplate",
    "warc_roundtrip_extract",
    "knn_graph_lsh_tier_search",
    "compaction_plan",
    "bitext_margin_mine",
    "tpch_q8_market_share",
    "tpch_q17_small_qty_revenue",
    "tpch_q21_waiting_supplier",
    "video_frame_stats",
    "audio_spectral_peaks",
    "wav_audio_features",
    "bmp_decode_stats",
    "tiff_decode_stats",
    "png_decode_stats",
    "gif_decode_stats",
    "kg_truthfinder_trust",
    "kg_truthfinder_facts",
    "fellegi_sunter_linkage",
    "cc_incremental_merge",
    "minhash_incremental_delta",
    "dedup_incremental_two_batch",
    "host_anf_hyperball",
    "host_trustrank_seeded",
    "host_harmonic_centrality",
    "web_bowtie_structure",
    "kg_condensation",
    "kg_allen_relations",
    "kg_interval_coalesce",
    "wikitext_infobox_triples",
    "snapshot_line_diff",
    "mobile_variant_clusters",
    "containment_syndication_pairs",
    "winnow_shared_pairs",
    "cms_heavy_hitters",
    "hll_distinct_tokens",
    "kmv_distinct_sketch",
    "textrank_keywords",
    "extractive_summary_top2",
    "gazetteer_entity_tags",
    "hearst_hypernyms",
    "kg_pronoun_coref",
    "quote_attribution",
    "embedding_quantize_int8",
    "dsir_importance_weights",
    "charset_detect_decode",
    "unicode_nfc_normalize",
    "robots_txt_fetch_policy",
    "cdx_fetch_list",
    "sitemap_frontier_diff",
    "tracker_density",
    "funnel_conversion",
    "retention_cohorts",
    "conversion_attribution",
    "event_markov_transitions",
    "ccnet_perplexity_buckets",
    "tpch_q2_min_cost_supplier",
    "wilson_conversion_rank",
    "gini_source_concentration",
    "burrows_delta_attribution",
    "tpch_q9_product_profit",
    "tpch_q20_part_promotion",
    "tpch_q7_volume_shipping",
    "tpch_q11_important_value",
    "tpch_q15_top_supplier",
    "tpch_q16_supplier_part_cnt",
    "flagship_semantic_search",
    "ppjoin_jaccard_pairs",
    "knn_graph_search",
    "knn_graph_incremental_insert",
    "knn_graph_delete_repair",
    "kg_literal_datatypes",
    "kg_datatype_enforce",
    "kg_rdfs_schema",
    "wand_topk_pruned",
    "span_corruption_t5",
    "warc_curation_pipeline",
    "kg_scd2_from_crawl",
    "sdm_proximity_rank",
    "collective_entity_linking",
    "cdc_dedup_chunks",
    "epoch_budget_waterfill",
    "rrf_fusion_topk",
    "unigram_viterbi_segment",
    "entity_relatedness_mw",
    "spell_correct_terms",
    "kg_construct_derived",
    "host_simrank_3",
    "node2vec_walks",
    "kg_ktruss",
    "kg_extraction_eval",
    "kg_attribute_merge",
    "semantic_dedup_pairs",
    "unigram_lm_scores",
    "main_content_extract",
    "pii_redact",
    "temperature_mix_sample",
    "bpe_train_merges",
    "boruvka_mst_forest",
    "kg_scd2_history",
    "ir_ranking_eval",
    "tpch_q5_local_supplier",
    "tpch_q18_big_orders",
    "fulltext_multifield_rank",
    "websearch_parse_filter",
    "phrase_search_positional",
    "dirichlet_ql_rank",
    "kmv_jaccard_pairs",
    "ac_multi_pattern_counts",
    "date_normalize_validate",
    "kg_distmult_score",
    "kneser_ney_bigram",
    "pq_adc_topk",
    "dawid_skene_round1",
    "rouge_l_dedup_pairs",
    "bipartite_butterflies",
    "dedup_apply_keepers",
    "click_model_pbm",
    "scaling_law_fit",
    "grouped_kfold_assign",
    "rake_keyphrases",
    "lexical_diversity_panel",
    "l_diversity_audit",
    "benford_quantity_audit",
    "unit_normalize_quantities",
    "wordpiece_encode",
    "association_rules_2item",
    "ppr_push_local",
    "hard_negative_mining",
    "ams_f2_sketch",
    "timeseries_gorilla_bits",
    "string_periodicity",
    "http_revalidation_plan",
    "autocomplete_prefix_topk",
    "matryoshka_overlap_eval",
    "kg_complex_score",
    "sample_budget_apportionment",
    "greedy_source_cover",
    "densest_subgraph_peel",
    "chi2_feature_selection",
    "mcnemar_paired_test",
    "measurement_facts_normalized",
    "mutual_nn_pairs",
    "skyline_pareto_docs",
    "lt_cascade_influence",
    "consistent_hash_ring",
    "knapsack_crawl_budget",
    "politeness_fetch_schedule",
    "elias_fano_postings",
    "sequential_pattern_support",
    "vocabulary_drift_jsd",
    "tpch_q12_late_priority",
    "tpch_q13_order_distribution",
    "tpch_q19_disjunctive_revenue",
    "tpch_q22_global_sales_opportunity",
    "kg_triples_synthetic",
    "kg_functional_keys",
    "kg_owl_inference",
    "jsonld_triples",
    "microdata_triples",
    "rdfa_triples",
    "orc_roundtrip",
    "kg_shacl_violations",
    "zorder_bucket_pruning",
    "jaro_winkler_scores",
    "image_dhash_near_dup",
    "training_mix_pipeline",
    "url_rendezvous_shards",
    "percolate_matches",
    "gopher_quality_filter",
    "weighted_sample_es",
    "xml_native_roundtrip",
    "copula_isa_polarity",
    "prf_query_expansion",
    "bleu_ngram_precisions",
    "k_anonymity_audit",
    "tpch_q4_priority_exists",
    "tpch_q6_forecast_revenue",
    "tpch_q10_returned_items",
    "tpch_q14_promo_share",
    "annotator_agreement_kappa",
    "contrastive_triplets",
    "kg_wl_colors",
    "ac_equals_expr_twin",
    "partition_edgecut_eval",
    "landmark_distance_eval",
    "soundex_blocking",
    "geohash_encode",
    "pdf_text_cleanup",
    "topk_incremental_merge",
    "column_encoding_stats",
    "postings_varint",
    "kg_cliques_k4",
    "seq_length_buckets",
    "doremi_domain_weights",
    "curriculum_order",
    "kg_community_conductance",
    "fim_transform_psm",
    "kg_inverse_predicates",
    "preference_pairs_crawl",
    "kg_bgp_minus",
    "colist_expansion",
    "kg_predicate_paraphrases",
    "host_spam_mass",
    "host_stress_centrality",
    "host_eccentricity",
    "host_link_reciprocity",
    "kg_clustering_coefficient",
    "kg_modularity",
    "snm_candidate_pairs",
    "ngram_novelty_curve",
    "nofollow_link_extract",
    "minhash_blocking_eval",
    "kg_bgp_aggregate",
    "mirror_host_pairs",
    "kg_statement_reification",
    "kg_degree_profile",
    "kg_assortativity",
    "kg_term_dictionary",
    "kg_encoded_triples",
    "wiki_internal_links",
    "fulltext_best_snippet",
    "host_pagerank_drift",
    "length_outliers_mad",
    "layout_template_census",
    "url_template_mining",
    "readability_scores",
    "html_list_triples",
    "mention_bursts",
    "appositive_isa",
    "homograph_spoof_pairs",
    "host_cocitation_pairs",
    "host_coupling_pairs",
    "kg_scc_bounded",
    "kg_entity_timeline",
    "soft404_detect",
    "according_to_claims",
    "entity_authority",
    "anchor_typed_edges",
    "domain_rollup",
    "declared_lang_mismatch",
    "kg_ego_subgraph",
    "kg_void_stats",
    "sitemap_index_expand",
    "kg_fact_confidence",
    "corpus_vocab_stats",
    "kg_seeded_label_propagation",
    "robots_sitemap_discovery",
    "kg_horn_rules",
    "kg_type_violations",
    "infobox_triples",
    "data_table_triples",
    "meta_og_cards",
    "rss_atom_entries",
    "minhash_pairs_md5",
    "host_shortest_paths_6",
    "simhash_near_dup_pairs",
    "cc_label_propagation",
    "e3_triples_inline_svo",
    "clean_corpus_filter_chain",
    "events_sessions_detail",
    "multimodal_features",
    "kmeans_domain_clusters",
    "kg_transe_eval",
    "kg_snapshot_diff",
    "kg_dated_facts",
    "quantity_facts",
    "breadcrumb_taxonomy",
    "geo_nearby_pairs",
    "redirect_resolution",
    "pagination_series",
    "canonical_clusters",
    "entity_salience",
    "hreflang_clusters",
    "crosslingual_aliases",
    "host_pagerank_5",
    "mention_disambiguation",
    "kg_fact_resolution",
    "kg_predicate_profile",
    "kg_bgp_optional",
    "kg_fact_rank",
    "kg_property_path",
    "kg_lpa_communities",
    "kg_triple_extent",
    "anchor_commonness_prior",
    "dedup_quality_keepers",
    "bpe_encode_corpus",
    "kg_entity_cards",
    "kg_source_reliability",
    "deepwalk_skipgram_pairs",
    "bigram_lm_scores",
    "csv_roundtrip",
    "acronym_alias_pairs",
    "kg_link_prediction",
    "pmi_collocations",
    "structured_entity_stats",
    "minhash_groups_md5",
    "dedup_span_removal",
    "host_outlink_profile",
    "kg_facts_as_of_2000",
    "simhash_fingerprint",
    "media_type_sniff",
    "winnow_fingerprint_summary",
    "kg_negative_samples",
    "ntriples_export",
    "kg_related_entities",
    "script_profile",
    "passage_windows_overlap",
    "frontier_politeness_budget",
    "setops_active_custkeys",
    "lineage_cube",
    "ivf_all_probe_equals_exact",
    "global_sort_rank",
    "chars_percentiles",
    "chars_percentiles_approx",
    "bm25_rank",
    "decontaminate_ngrams",
    "kg_pagerank",
    "kg_bgp_chain",
    "kg_transitive_closure",
    "kg_triangles",
    "kg_entity_types",
    "url_canonicalize",
    "url_latest_crawl",
    "link_extract_canonical",
    "host_graph_edges",
    "anchor_alias_mining",
    "crawl_change_stats",
    "domain_blocklist_filter",
    "quality_classifier_hashed",
    "robots_noindex_filter",
    "host_hits_5",
    "kcore_peel",
    "bloom_prefilter_dedup",
    "duplicate_ngram_spans",
    "bpe_pair_stats",
    "paragraph_dedup",
    "kg_transe_score",
    "host_random_walks",
    "crawl_schedule_priority",
    "jsonl_roundtrip",
    "u5_doc_dispatch",
    "kg_session_provenance",
    "pack_sequences_greedy",
    "udaf_geomean_chars",
    "udtf_sentence_explode",
    "hybrid_search_two_arm",
    "embedding_near_dup",
    "ngram_jaccard_pairs",
    "dedup_exact",
    "knn_join_top3",
    "asof_join_purchase_click",
    "range_join_purchase_clicks",
    "events_sessionize",
    "g1_qa_assembly",
    "t5_language_validate",
    "t1_clean_html",
    "q4_fulltext_rank",
    "q4_fuzzy_match",
    "hash_split_assign",
    "stratified_sample_top3",
    "lineage_rollup",
    "repetition_signals",
    "quality_features",
    "lang_id_heuristic",
    "doc_fingerprint",
    "token_counts",
    "g2_coalesce_json",
    "g3_reassembly",
    "tpch_q1_pricing_summary",
    "tpch_q3_top_revenue",
    "f7_resume_anti_join",
    "f6_xml_attr_projection",
    "g4_hit_counts",
    "g5_round_robin",
    "compression_ratio_signal",
    "classifier_calibration_bins",
    "kg_rdf_lists",
    "events_pivot_daily",
]

QUERY_DEMOTIONS: dict[str, str] = {
    "t8_truncate": "trivial kernel wrapper; byte-golden pytest vs reference kernel",
    "t9_display_url": "trivial kernel wrapper; byte-golden pytest vs reference kernel",
    "t7_strip_punct": "trivial kernel wrapper; byte-golden pytest vs reference kernel",
    "t2_codeblocks": "trivial kernel wrapper; byte-golden pytest vs reference kernel",
    "t3_replace_codeblocks": "trivial kernel wrapper; byte-golden pytest vs reference kernel",
    "t4_clean_se": "trivial kernel wrapper; byte-golden pytest vs reference kernel",
    "f1_do_not_read": "trivial filter wrapper; plan-gated in tests/test_plans.py",
    "f2_suffix_filter": "trivial filter wrapper; plan-gated in tests/test_plans.py",
    "f5_meta_projection": "trivial projection wrapper",
    "f8_site_filter": "trivial partition-pruned filter; plan-gated",
    "q5_point_lookup": "trivial point lookup",
    "q4_text_match": "trivial LIKE filter; superseded by the fulltext rank gates",
    "broadcast_chain_region_suppliers": "broadcast-join demo; plan-gated in tests/test_plans.py",
    "order_date_math": "date-math demo; pytest goldens cover it",
    "q7_pca_map": "rows-only by design: PCA sign/rotation ambiguity (documented)",
    "ivf_topk_search": "rows-only approximation; value-gated via ivf_all_probe_equals_exact",
    "minhash_dedup_groups": "rows-only xxhash path; value-gated via the md5 twin gates",
}


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    q: dict[str, Callable[[SparkSession, str], DataFrame]] = {}

    q["flagship_semantic_search"] = _flagship

    # ---- scalar text kernels (SURVEY §2.3) ----
    def t1_clean_html(spark, sf):
        d = _t(spark, sf, "documents")
        return d.select("doc_id", clean_text_udf(HTML_WRAP_SPARK(F.col("text"))).alias("cleaned"))

    q["t1_clean_html"] = t1_clean_html

    def t4_clean_se(spark, sf):
        d = _t(spark, sf, "documents")
        wrapped = F.concat(F.lit("<p>"), F.col("text"), F.lit(" p&gt; /p&gt; &lt;pre&gt; end</p>"))
        return d.select("doc_id", clean_text_se_udf(wrapped).alias("cleaned"))

    q["t4_clean_se"] = t4_clean_se

    def t2_codeblocks(spark, sf):
        d = _t(spark, sf, "documents")
        blocks = extract_codeblocks_udf(CODE_WRAP_SPARK(F.col("text")))
        return d.select("doc_id", F.posexplode(blocks).alias("block_no", "codeblock"))

    q["t2_codeblocks"] = t2_codeblocks

    def t3_replace_codeblocks(spark, sf):
        from aiwhispr_spark.functions.udfs import replace_codeblocks_udf

        d = _t(spark, sf, "documents")
        return d.select(
            "doc_id",
            replace_codeblocks_udf(CODE_WRAP_SPARK(F.col("text")), F.lit(2)).alias("replaced"),
        )

    q["t3_replace_codeblocks"] = t3_replace_codeblocks

    def t9_display_url(spark, sf):
        from aiwhispr_spark.functions.udfs import display_url_udf

        d = _t(spark, sf, "documents")
        prefix = F.concat(F.lit("http://site "), F.col("source"))
        nonhttp = F.concat(F.lit("/mnt/data "), F.col("source"))
        path = F.concat(F.lit("page dir/"), F.col("doc_id").cast("string"), F.lit(" x?.txt"))
        return d.select(
            "doc_id",
            display_url_udf(prefix, path).alias("url_http"),
            display_url_udf(nonhttp, path).alias("url_plain"),
        )

    q["t9_display_url"] = t9_display_url

    def t7_strip_punct(spark, sf):
        d = _t(spark, sf, "documents")
        return d.select(
            "doc_id",
            strip_punctuation_udf(F.concat(F.col("text"), F.lit(PUNCT_SUFFIX))).alias("stripped"),
        )

    q["t7_strip_punct"] = t7_strip_punct

    def t8_truncate(spark, sf):
        d = _t(spark, sf, "documents")
        tripled = F.concat(F.col("text"), F.col("text"), F.col("text"))
        return d.select("doc_id", truncate_display_expr(tripled).alias("display"))

    q["t8_truncate"] = t8_truncate

    # ---- filters / projections (SURVEY §2.2) ----
    def meta_projection(spark, sf):
        d = _t(spark, sf, "documents")
        return (
            d.filter(F.col("n_chars") > 0)
            .select(
                "doc_id",
                "source",
                "n_chars",
                F.length("text").alias("text_len"),
                F.regexp_replace("source", "^src", "site_").alias("site"),
            )
        )

    q["f5_meta_projection"] = meta_projection

    def f1_do_not_read(spark, sf):
        d = _t(spark, sf, "documents")
        return d.filter(
            ~F.col("source").isin("src3", "src7") & ~F.col("text").rlike("window window window")
        ).select("doc_id")

    q["f1_do_not_read"] = f1_do_not_read

    def f7_resume_anti_join(spark, sf):
        d = _t(spark, sf, "documents")
        ev = _t(spark, sf, "events")
        return d.join(
            ev.select(F.col("user_id").alias("doc_id")).distinct(), "doc_id", "left_anti"
        ).select("doc_id")

    q["f7_resume_anti_join"] = f7_resume_anti_join

    def f8_site_filter(spark, sf):
        ev = _t(spark, sf, "events")
        return ev.filter(F.col("event_type") == "click").select("event_id", "user_id")

    q["f8_site_filter"] = f8_site_filter

    def f2_suffix_filter(spark, sf):
        p = _t(spark, sf, "part")
        return p.filter(F.col("p_type").isin("ECONOMY", "PROMO")).select(
            "p_partkey", "p_type"
        )

    q["f2_suffix_filter"] = f2_suffix_filter

    def f6_xml_attr_projection(spark, sf):
        # the reference's typed XML-attribute getters (extract_int/str/ts_
        # attribute_xml_element.py) over synthesized <row .../> elements
        o = _t(spark, sf, "orders")
        xml = F.concat(
            F.lit('<row Id="'), F.col("o_orderkey"),
            F.lit('" Pri="'), F.col("o_orderpriority"),
            F.lit('" Ts="1995-03-15T10:30:00.000"/>'),
        )
        src = o.select(xml.alias("xml"))
        return src.select(
            F.regexp_extract("xml", r'Id="([^"]*)"', 1).cast("int").alias("id_attr"),
            F.regexp_extract("xml", r'Pri="([^"]*)"', 1).alias("pri_attr"),
            F.unix_timestamp(
                F.to_timestamp(
                    F.regexp_extract("xml", r'Ts="([^"]*)"', 1),
                    "yyyy-MM-dd'T'HH:mm:ss.SSS",
                )
            ).cast("long").alias("ts_epoch"),
        )

    q["f6_xml_attr_projection"] = f6_xml_attr_projection

    def g2_coalesce(spark, sf):
        # G2's coalesce-chain semantics over a JSON side-channel (events.props)
        ev = _t(spark, sf, "events")
        k = F.get_json_object("props", "$.k")
        return ev.select(
            "event_id",
            F.coalesce(F.nullif(k, F.lit("0")), F.lit("-1")).cast("int").alias("k_final"),
        )

    q["g2_coalesce_json"] = g2_coalesce

    def u5_doc_dispatch(spark, sf):
        # U5 suffix → extractor dispatch through the REAL registry, all SIX
        # real arms (docproc._EXTRACTORS: txt passthrough, html→T1 clean,
        # pdf→minimal PDF extractor — these text payloads are not PDFs, so
        # the reference-shaped '[PDF]' banner keeps the oracle closed-form;
        # real-PDF extraction is golden-tested in tests/test_docproc.py —
        # and docx/xlsx/pptx: the payload is a REAL OOXML zip built from the
        # row's text, so a hash match proves the stdlib zip+XML extraction
        # round-trips byte-exactly end to end)
        from aiwhispr_spark.docproc import dispatch_extract_udf, office_payload_udf

        office_payload = office_payload_udf()
        d = _t(spark, sf, "documents")
        kinds = ["txt", "html", "pdf", "docx", "xlsx", "pptx"]
        suffix = F.element_at(
            F.array(*[F.lit(s) for s in kinds]), (F.col("doc_id") % 6 + 1).cast("int")
        )
        payload = F.when(
            suffix.isin("docx", "xlsx", "pptx"), office_payload(suffix, F.col("text"))
        ).otherwise(
            F.encode(
                F.when(suffix == "html", HTML_WRAP_SPARK(F.col("text"))).otherwise(F.col("text")),
                "UTF-8",
            )
        )
        return d.select(
            "doc_id",
            suffix.alias("suffix"),
            dispatch_extract_udf()(suffix, payload).alias("extracted"),
        )

    q["u5_doc_dispatch"] = u5_doc_dispatch

    def t5_language_validate(spark, sf):
        # full value gate via the lookbehind-emulating DuckDB twin (_t5_sql)
        from aiwhispr_spark.functions.udfs import validate_chunk_udf

        d = _t(spark, sf, "documents").filter(F.col("doc_id") < 300)
        mixed = F.concat(F.col("text"), F.lit(T5_TAIL))
        return d.select("doc_id", validate_chunk_udf(mixed).alias("validated"))

    q["t5_language_validate"] = t5_language_validate

    # ---- grouping / assembly (SURVEY §2.5) ----
    def g1_qa_assembly(spark, sf):
        from aiwhispr_spark.operators.qa import assemble_qa

        orders = _t(spark, sf, "orders").select(
            F.col("o_orderkey").alias("post_id"), F.col("o_orderpriority").alias("body")
        )
        answers = _t(spark, sf, "lineitem").select(
            F.col("l_orderkey").alias("parent_id"),
            F.col("l_linenumber").alias("answer_order"),
            F.concat("l_returnflag", "l_linestatus").alias("body"),
        )
        return assemble_qa(
            orders, answers, q_id="post_id", a_parent="parent_id", a_order="answer_order"
        ).select("post_id", "post_body_for_llm")

    q["g1_qa_assembly"] = g1_qa_assembly

    def g3_reassembly(spark, sf):
        from aiwhispr_spark.operators.qa import ordered_concat

        ev = _t(spark, sf, "events").withColumn(
            "ord", F.struct(F.col("ts"), F.col("event_id"))
        )
        return ordered_concat(ev, "user_id", "ord", "event_type", out_col="doc")

    q["g3_reassembly"] = g3_reassembly

    def g4_counts(spark, sf):
        ev = _t(spark, sf, "events")
        return ev.groupBy("event_type").agg(F.count(F.lit(1)).alias("n"))

    q["g4_hit_counts"] = g4_counts

    def g5_round_robin(spark, sf):
        from aiwhispr_spark.operators.qa import round_robin_split

        d = _t(spark, sf, "documents")
        return round_robin_split(d, 8, "doc_id").select("doc_id", "worker")

    q["g5_round_robin"] = g5_round_robin

    # ---- query-side (SURVEY §2.7) ----
    def q5_point_lookup(spark, sf):
        emb = _t(spark, sf, "embeddings")
        return emb.filter(F.col("vec_id") == 123).select(
            "vec_id", "label", F.size("embedding").alias("dim")
        )

    q["q5_point_lookup"] = q5_point_lookup

    def q4_text_match(spark, sf):
        d = _t(spark, sf, "documents")
        return (
            d.filter(F.col("text").like("%vector%"))
            .groupBy("source")
            .agg(F.count(F.lit(1)).alias("n_match"))
        )

    q["q4_text_match"] = q4_text_match

    def q4_fulltext_rank(spark, sf):
        # Q4 proper: inverted-index build → broadcast term join → tf-sum rank
        from aiwhispr_spark.operators.fulltext import build_inverted_index, search_terms

        d = _t(spark, sf, "documents")
        idx = build_inverted_index(d, "text", "doc_id")
        top = search_terms(idx, ["data", "query", "fast"], k=20)
        return top.withColumnRenamed("id", "doc_id")

    q["q4_fulltext_rank"] = q4_fulltext_rank

    def q4_fuzzy_match(spark, sf):
        # Q4 fuzzy arm: levenshtein ≤ 2 vocabulary match (the mongo
        # connector's $search fuzzy maxEdits=2, mongodbVectorDb.py:275-295);
        # typo'd query terms so the fuzzy path itself carries the result
        from aiwhispr_spark.operators.fulltext import (
            build_inverted_index,
            search_terms_fuzzy,
        )

        d = _t(spark, sf, "documents")
        idx = build_inverted_index(d, "text", "doc_id")
        top = search_terms_fuzzy(idx, ["dta", "querry", "fasst"], k=20, max_edits=2)
        return top.withColumnRenamed("id", "doc_id")

    q["q4_fuzzy_match"] = q4_fuzzy_match

    def hybrid_two_arm(spark, sf):
        # the reference's withtextsearch=Y combined response: semantic top-25
        # AND text top-20 with per-arm found counts in one result set
        # (searchService.py:73-97; typesenseVectorDb.py:214-282)
        from aiwhispr_spark.operators.fulltext import hybrid_search

        emb = _t(spark, sf, "embeddings")
        d = _t(spark, sf, "documents")
        qvec = [float(x) for x in emb.filter(F.col("vec_id") == 0).first()["embedding"]]
        return hybrid_search(d, emb, ["data", "query", "fast"], qvec)

    q["hybrid_search_two_arm"] = hybrid_two_arm

    def fulltext_multifield(spark, sf):
        # typesense query_by multi-field semantics (VERDICT r2 #5,
        # typesenseVectorDb.py:229-233): title (w=3) and content_path (w=5)
        # hits outrank body (w=1) hits.  title/path are derived from the
        # documents row with expressions DuckDB mirrors exactly; the path
        # term 'src3/3.txt' pins the path arm, 'spark'/'batch' exercise
        # title-vs-body weighting (title = first 30 chars of text).
        from aiwhispr_spark.operators.fulltext import search_fields_weighted

        d = _t(spark, sf, "documents").select(
            "doc_id",
            "text",
            F.substring("text", 1, 30).alias("title"),
            F.concat("source", F.lit("/"), F.col("doc_id").cast("string"), F.lit(".txt")).alias(
                "content_path"
            ),
        )
        top = search_fields_weighted(
            d,
            ["spark", "batch", "src3/3.txt"],
            {"text": 1.0, "title": 3.0, "content_path": 5.0},
            k=30,
        )
        return top.withColumnRenamed("id", "doc_id")

    q["fulltext_multifield_rank"] = fulltext_multifield

    def websearch_filter(spark, sf):
        # postgres websearch_to_tsquery parity (VERDICT r2 #6,
        # postgresVectorDb.py:490-493): quoted phrase AND (scan OR merge)
        # AND NOT vector, parsed by fulltext.parse_websearch and compiled to
        # one pure-JVM predicate; the oracle is the same fixed query
        # hand-translated to SQL, so a mis-parse or mis-compile breaks the
        # hash.  Parser unit coverage: tests/test_operators.py.
        from aiwhispr_spark.operators.fulltext import websearch_match

        d = _t(spark, sf, "documents")
        return d.filter(
            websearch_match(F.col("text"), '"table value" scan OR merge -vector')
        ).select("doc_id", "lang")

    q["websearch_parse_filter"] = websearch_filter

    def phrase_positional(spark, sf):
        # phrase search THE SCALE WAY: positional-posting intersection
        # (shift each word's postings by its phrase offset, count full-slot
        # starts) instead of websearch_match's substring scan — the access
        # path a 100 TB corpus needs (index written once, bucketed by token;
        # queries touch only their terms' posting lists)
        from aiwhispr_spark.operators.fulltext import (
            build_positional_index,
            search_phrase,
        )

        d = _t(spark, sf, "documents")
        idx = build_positional_index(d, "text", "doc_id")
        return search_phrase(idx, "hash value", k=20).withColumnRenamed("id", "doc_id")

    q["phrase_search_positional"] = phrase_positional

    def bm25_rank(spark, sf):
        # BM25 (Lucene idf form) over the inverted index + doc lengths — the
        # standard relevance ranking the tf-sum queries approximate; double
        # math is written in the same association order as the DuckDB twin
        # so round(1e4·score) hashes identically
        from aiwhispr_spark.operators.fulltext import (
            build_inverted_index,
            search_terms_bm25,
        )

        d = _t(spark, sf, "documents")
        idx = build_inverted_index(d, "text", "doc_id")
        from aiwhispr_spark.operators.fulltext import tokenize

        dl = d.select(
            F.col("doc_id").alias("id"),
            F.size(F.filter(tokenize(F.col("text")), lambda t: t != "")).cast("double").alias("dl"),
        )
        top = search_terms_bm25(idx, dl, ["data", "query", "fast"], k=20)
        return top.withColumnRenamed("id", "doc_id")

    q["bm25_rank"] = bm25_rank

    def sdm_rank(spark, sf):
        # SDM proximity ranking (fulltext.py::sdm_score): term + ordered-
        # bigram (#1) + unordered-window (#uw8) features, integer weights
        # 85/10/5 — per-term position arrays and both proximity counts are
        # zero-shuffle JVM array folds; the oracle recomputes them
        # relationally from an indexed-token self-join.
        from aiwhispr_spark.operators.fulltext import sdm_score

        return sdm_score(
            _t(spark, sf, "documents"), ["table", "scan", "fast"], k=15
        )

    q["sdm_proximity_rank"] = sdm_rank

    def decontaminate(spark, sf):
        # benchmark decontamination (GPT-3 13-gram rule): benchmark = every
        # 50th doc; those docs flag 100% contaminated, plus any organic
        # 13-gram collisions — the per-doc window/hit counts are the gate
        from aiwhispr_spark.operators.decontam import ngram_decontaminate

        d = _t(spark, sf, "documents")
        bench = d.filter(F.col("doc_id") % 50 == 0)
        rep = ngram_decontaminate(d, bench, n=13)
        return rep.select(
            F.col("id").alias("doc_id"),
            "n_grams",
            "n_hit",
            F.col("contaminated").cast("int").alias("contaminated"),
        )

    q["decontaminate_ngrams"] = decontaminate

    def novelty_q(spark, sf):
        # First-seen n-gram novelty curve (decontam.py::ngram_novelty_curve):
        # marginal coverage contribution per doc in crawl order, computed by
        # min-(ts,id) ELECTION instead of sequential state.  Closed-form
        # 4-token docs → exactly three distinct bigrams each; the oracle
        # enumerates the same gram rows and elects min doc id.
        from aiwhispr_spark.operators.decontam import ngram_novelty_curve

        d = _t(spark, sf, "documents").select("doc_id")
        i = F.col("doc_id")
        text = F.concat(
            F.lit("a"), (i % 5).cast("string"),
            F.lit(" b"), (i % 7).cast("string"),
            F.lit(" c"), (i % 3).cast("string"),
            F.lit(" d"), (i % 11).cast("string"),
        )
        docs = d.select("doc_id", i.alias("ts"), text.alias("text"))
        return ngram_novelty_curve(docs, n=2).withColumnRenamed("id", "doc_id")

    q["ngram_novelty_curve"] = novelty_q

    def kg_pagerank(spark, sf):
        # PageRank over the synthetic corpus's triple graph (subj→obj edge
        # set): 5 synchronous iterations with dangling redistribution —
        # iterative DataFrame joins with per-step materialization
        # (operators/graph.py); oracle = the SAME recurrence unrolled in SQL
        # over the _kg_e2e_sql triple set.  pr scaled ×1e6 (values ~1/N).
        from aiwhispr_spark.functions.udfs import extract_triples_df
        from aiwhispr_spark.operators.graph import pagerank
        from aiwhispr_spark.plans.kg_pipeline import docs_to_chunks

        docs = spark.read.parquet(_ensure_simple_corpus())
        t = extract_triples_df(docs_to_chunks(docs))
        edges = t.select(F.col("subj").alias("src"), F.col("obj").alias("dst"))
        pr = pagerank(edges, damping=0.85, iterations=5, num_partitions=8)
        return pr.select(
            "node", F.round(F.col("pr") * 1000000).cast("long").alias("pr_i")
        )

    q["kg_pagerank"] = kg_pagerank

    def _corpus_triples(spark):
        from aiwhispr_spark.functions.udfs import extract_triples_df
        from aiwhispr_spark.plans.kg_pipeline import docs_to_chunks

        docs = spark.read.parquet(_ensure_simple_corpus())
        return extract_triples_df(docs_to_chunks(docs)).select("subj", "pred", "obj")

    def kg_dated(spark, sf):
        # Temporally-qualified fact extraction (temporal.py::
        # extract_dated_facts): two dated sentences per closed-form doc —
        # "acquired ... in YYYY" and "has been based in ... since YYYY".
        # Oracle emits the expected qualified triples from arithmetic.
        from aiwhispr_spark.operators.temporal import extract_dated_facts

        d = _t(spark, sf, "documents").select("doc_id")
        a = (F.col("doc_id") % 37).cast("string")
        b = (F.col("doc_id") % 11).cast("string")
        c = ((F.col("doc_id") * 3) % 13).cast("string")
        y1 = (1980 + F.col("doc_id") % 40).cast("string")
        y2 = (1990 + F.col("doc_id") % 30).cast("string")
        text = F.concat(
            F.lit("Entity_"), a, F.lit(" acquired E"), b, F.lit(" Corp in "),
            y1, F.lit(". "),
            F.lit("Entity_"), a, F.lit(" has been based in City"), c,
            F.lit(" since "), y2, F.lit("."),
        )
        chunks = d.select(
            F.concat(F.lit("u"), F.col("doc_id").cast("string")).alias("url"),
            text.alias("text_chunk"),
        )
        return extract_dated_facts(chunks)

    q["kg_dated_facts"] = kg_dated

    def kg_as_of(spark, sf):
        # Point-in-time KG view (temporal.py::facts_valid_at over the same
        # dated corpus): facts valid in 2000 — 'in y' needs y == 2000,
        # 'since y' needs y <= 2000.  Oracle applies the same predicate to
        # its closed-form rows.
        from aiwhispr_spark.operators.temporal import facts_valid_at

        return facts_valid_at(kg_dated(spark, sf), 2000)

    q["kg_facts_as_of_2000"] = kg_as_of

    def kg_interval_coalesce(spark, sf):
        # Validity-interval coalescing (temporal.py::coalesce_fact_intervals):
        # gaps-and-islands per fact key — observations ≤30 apart merge, a
        # longer silence closes the interval.  Observations are closed-form
        # (fact = doc_id%10, ts = 13·doc_id mod 997 — unique per fact for
        # doc_id<997), so the oracle runs the same lag/running-sum windows.
        from aiwhispr_spark.operators.temporal import coalesce_fact_intervals

        obs = _t(spark, sf, "documents").select(
            F.concat(F.lit("E"), (F.col("doc_id") % 10).cast("string")).alias("subj"),
            F.lit("active").alias("pred"),
            F.lit("Y").alias("obj"),
            ((F.col("doc_id") * 13) % 997).alias("ts"),
        )
        return coalesce_fact_intervals(obs, gap=30)

    q["kg_interval_coalesce"] = kg_interval_coalesce

    def kg_allen_relations(spark, sf):
        # Allen interval algebra (temporal.py::allen_relations): per-subject
        # pairwise relation labels over closed-form strict intervals
        # (s = 3·doc_id mod 29, len = 1 + 5·doc_id mod 11) — the temporal
        # consistency primitive.  Conditions are complete (no fall-through),
        # so the oracle's CASE chain is order-independent by construction.
        from aiwhispr_spark.operators.temporal import allen_relations

        iv = _t(spark, sf, "documents").select(
            F.concat(F.lit("E"), (F.col("doc_id") % 17).cast("string")).alias("subj"),
            F.col("doc_id").alias("fid"),
            ((F.col("doc_id") * 3) % 29).alias("s"),
            (
                (F.col("doc_id") * 3) % 29 + 1 + (F.col("doc_id") * 5) % 11
            ).alias("e"),
        )
        return allen_relations(iv)

    q["kg_allen_relations"] = kg_allen_relations

    def _truth_obs(spark, sf):
        # conflicting-claim fixture: 9 hosts (6 honest, 3 spam), 20 subjects;
        # honest hosts assert the subject-derived object, spam hosts assert
        # doc-dependent junk — all closed-form from doc_id.
        d = _t(spark, sf, "documents")
        s = F.col("doc_id") % 20
        h = F.col("doc_id") % 9
        return d.select(
            F.concat(F.lit("h"), h.cast("string")).alias("host"),
            F.concat(F.lit("S"), s.cast("string")).alias("subj"),
            F.lit("ceo_of").alias("pred"),
            F.when(h < 6, F.concat(F.lit("P"), (s % 5).cast("string")))
            .otherwise(F.concat(F.lit("Q"), (F.col("doc_id") % 3).cast("string")))
            .alias("obj"),
        )

    def kg_truthfinder_facts(spark, sf):
        # Iterative truth discovery, fact side (temporal.py::truthfinder):
        # 3 full trust⇄belief rounds of the integer-exact Sums/Average
        # update — the fixpoint that source_reliability/fact_confidence
        # half-round.  Oracle unrolls the same 3 rounds as chained CTEs.
        from aiwhispr_spark.operators.temporal import truthfinder

        return truthfinder(_truth_obs(spark, sf), rounds=3, output="facts")

    q["kg_truthfinder_facts"] = kg_truthfinder_facts

    def kg_truthfinder_trust(spark, sf):
        # the host-trust side of the same fixpoint
        from aiwhispr_spark.operators.temporal import truthfinder

        return truthfinder(_truth_obs(spark, sf), rounds=3, output="trust")

    q["kg_truthfinder_trust"] = kg_truthfinder_trust

    def kg_statement_reify(spark, sf):
        # RDF reification of the dated-fact extractor's output (rdf.py::
        # reify_statements): content-derived statement nodes with
        # rdf:subject/predicate/object, the temporal qualifier, and
        # per-source provenance rows.  Oracle rebuilds the same long-form
        # rows (md5 statement ids) from the closed-form dated facts.
        from aiwhispr_spark.operators.rdf import reify_statements

        return reify_statements(kg_dated(spark, sf))

    q["kg_statement_reification"] = kg_statement_reify

    def kg_degree_profile(spark, sf):
        # Power-of-two degree histogram of the entity graph (graph.py::
        # degree_profile) — ⌊log2(deg)⌋ via length(bin(deg))−1, no float
        # log; the profile that decides hub caps/salting before big joins.
        from aiwhispr_spark.operators.graph import degree_profile

        return degree_profile(_entity_edges(spark))

    q["kg_degree_profile"] = kg_degree_profile

    def kg_assortativity(spark, sf):
        # Degree assortativity of the entity graph (graph.py::
        # degree_assortativity): exact BIGINT sums + one IEEE sqrt/division
        # step for r_i — the link-farm drift detector.  Oracle = the same
        # symmetrized-sums SQL.
        from aiwhispr_spark.operators.graph import degree_assortativity

        return degree_assortativity(_entity_edges(spark))

    q["kg_assortativity"] = kg_assortativity

    def host_harmonic(spark, sf):
        # Bounded harmonic centrality over the host graph (graph.py::
        # harmonic_centrality, 6 hops): Σ ⌊1e6/d⌋ over reaching sources —
        # exact integers, disconnection-safe.  Oracle unrolls the same
        # min-hop relaxation rounds.
        from aiwhispr_spark.operators.graph import harmonic_centrality
        from aiwhispr_spark.operators.linkgraph import extract_links, host_edges

        docs = spark.read.parquet(_ensure_link_corpus())
        edges = host_edges(extract_links(docs)).select(
            F.col("src_host").alias("src"), F.col("dst_host").alias("dst")
        )
        return harmonic_centrality(edges, max_hops=6)

    q["host_harmonic_centrality"] = host_harmonic

    def kg_term_dictionary(spark, sf):
        # Dictionary-encoded triple store, dictionary half (rdf.py::
        # triple_dictionary): dense 0-based ids under lexicographic term
        # order via the scale-safe global rank (range exchange + offsets,
        # no single-partition window) + per-position flags.  Oracle =
        # row_number over the same distinct-term set.
        from aiwhispr_spark.operators.rdf import triple_dictionary

        return triple_dictionary(_corpus_triples(spark))

    q["kg_term_dictionary"] = kg_term_dictionary

    def kg_encoded_triples(spark, sf):
        # the encoding half: the triple multiset re-expressed as 24-byte
        # (s_id, p_id, o_id) rows via three dictionary joins
        from aiwhispr_spark.operators.rdf import encode_triples, triple_dictionary

        t = _corpus_triples(spark)
        return encode_triples(t, triple_dictionary(t))

    q["kg_encoded_triples"] = kg_encoded_triples

    def wikitext_infobox(spark, sf):
        # MediaWiki dump source (sources/mediawiki.py): splittable
        # lineSep='</page>' text scan → XML-unescaped title/body → first
        # infobox's type + param lines as triples.  Oracle = expected rows
        # from the fixture's page-index arithmetic (independent of every
        # regex in the reader).
        from aiwhispr_spark.sources.mediawiki import infobox_triples, read_mediawiki_pages

        pages = read_mediawiki_pages(spark, _ensure_mediawiki_dump())
        return infobox_triples(pages)

    q["wikitext_infobox_triples"] = wikitext_infobox

    def wiki_links(spark, sf):
        # internal [[link]] graph from the same dump: labels and #section
        # anchors stripped, duplicates kept
        from aiwhispr_spark.sources.mediawiki import internal_links, read_mediawiki_pages

        pages = read_mediawiki_pages(spark, _ensure_mediawiki_dump())
        return internal_links(pages)

    q["wiki_internal_links"] = wiki_links

    def best_snippet_q(spark, sf):
        # Query-biased snippet selection (fulltext.py::best_snippet):
        # densest 8-token window for {join, hash, scan}, hit-position
        # candidate starts only, earliest-start ties.  Oracle = the same
        # hit-pair window count + slice in SQL.
        from aiwhispr_spark.operators.fulltext import best_snippet

        return best_snippet(
            _t(spark, sf, "documents"), ["join", "hash", "scan"], window=8
        )

    q["fulltext_best_snippet"] = best_snippet_q

    def pagerank_drift_q(spark, sf):
        # Two-epoch authority drift (linkgraph.py::host_pagerank_drift):
        # pagerank per page-index parity epoch, full-outer joined, absent
        # hosts carry 0.  Oracle = two unrolled pageranks over the
        # closed-form epoch edge sets, full-joined the same way.
        from aiwhispr_spark.operators.linkgraph import host_pagerank_drift

        docs = spark.read.parquet(_ensure_link_corpus())
        i = F.regexp_extract("url", r"a/(\d+)$", 1).cast("long")
        return host_pagerank_drift(docs, (i % 2) == 1, num_partitions=8)

    q["host_pagerank_drift"] = pagerank_drift_q

    def length_outliers(spark, sf):
        # Robust median/MAD outlier flags per source (textstats.py::
        # robust_outliers) over n_chars — exact quantile_disc twins,
        # cross-multiplied threshold, MAD-0 sentinel.
        from aiwhispr_spark.operators.textstats import robust_outliers

        return robust_outliers(
            _t(spark, sf, "documents"), "n_chars", "source", "doc_id", k_pm=2000
        )

    q["length_outliers_mad"] = length_outliers

    def layout_census_q(spark, sf):
        # Template census (structured.py::layout_census): simhash of the
        # opening-tag BIGRAM stream per page, counted per host — the
        # single-template-farm detector.  Three closed-form layouts
        # (div/p, table/tr/td, ul/li/li) over 4 hosts; oracle computes the
        # same three bigram simhashes from literal token lists.
        from aiwhispr_spark.operators.structured import layout_census

        d = _t(spark, sf, "documents")
        v = F.col("doc_id") % 3
        html = (
            F.when(v == 0, F.lit("<html><body><div><p>x</p></div></body></html>"))
            .when(v == 1, F.lit("<html><body><table><tr><td>x</td></tr></table></body></html>"))
            .otherwise(F.lit("<html><body><ul><li>a</li><li>b</li></ul></body></html>"))
        )
        pages = d.select(
            F.concat(F.lit("L"), (F.col("doc_id") % 4).cast("string")).alias("host"),
            html.alias("html"),
        )
        return layout_census(pages)

    q["layout_template_census"] = layout_census_q

    def quote_attr(spark, sf):
        # Quotation attribution (quotes.py::extract_quotes): one leading-arm
        # and one trailing-arm quote per closed-form doc, plus a pronoun
        # speaker ("It said, ...") the guard must drop.  Oracle emits the
        # two expected rows per doc from arithmetic.
        from aiwhispr_spark.operators.quotes import extract_quotes

        d = _t(spark, sf, "documents").select("doc_id")
        p1 = (F.col("doc_id") % 23).cast("string")
        p2 = ((F.col("doc_id") + 5) % 23).cast("string")
        m = (F.col("doc_id") % 7).cast("string")
        pct = (F.col("doc_id") % 50).cast("string")
        city = ((F.col("doc_id") * 3) % 13).cast("string")
        text = F.concat(
            F.lit("Person"), p1, F.lit(' said, "Metric '), m,
            F.lit(" improved by "), pct, F.lit(' percent." '),
            F.lit('"We expanded to City'), city, F.lit('," said Person'), p2,
            F.lit('. It said, "never attribute me."'),
        )
        chunks = d.select(
            F.concat(F.lit("u"), F.col("doc_id").cast("string")).alias("url"),
            text.alias("text_chunk"),
        )
        return extract_quotes(chunks)

    q["quote_attribution"] = quote_attr

    def acro_alias(spark, sf):
        # Acronym-alias mining (canonicalize.py::mine_acronym_aliases):
        # every closed-form doc defines one valid acronym (20 distinct
        # pairs corpus-wide), one initials-mismatch decoy, and a leading
        # "The" the last-k-token rule must self-trim.
        from aiwhispr_spark.operators.canonicalize import mine_acronym_aliases

        d = _t(spark, sf, "documents").select("doc_id")
        w1 = F.element_at(
            F.array(*[F.lit(x) for x in ("Global", "United", "National", "Federal")]),
            (F.col("doc_id") % 4 + 1).cast("int"),
        )
        w2 = F.element_at(
            F.array(
                *[F.lit(x) for x in ("Widget", "Health", "Trade", "Data", "Energy")]
            ),
            (F.col("doc_id") % 5 + 1).cast("int"),
        )
        acr = F.concat(
            F.substring(w1, 1, 1), F.substring(w2, 1, 1), F.lit("O")
        )
        text = F.concat(
            F.lit("The "), w1, F.lit(" "), w2, F.lit(" Organization ("), acr,
            F.lit(") convened. Broken Name Zone (BNQ) is noise."),
        )
        chunks = d.select(
            F.concat(F.lit("u"), F.col("doc_id").cast("string")).alias("url"),
            text.alias("text_chunk"),
        )
        return mine_acronym_aliases(chunks)

    q["acronym_alias_pairs"] = acro_alias

    def quantity(spark, sf):
        # Quantity-literal normalization (literals.py::
        # extract_quantity_facts): every closed-form doc asserts a $x.y
        # billion revenue, an "n,500 people" headcount (comma separator),
        # and a p.5% margin — all three land on exact scaled integers.
        from aiwhispr_spark.operators.literals import extract_quantity_facts

        d = _t(spark, sf, "documents").select("doc_id")
        a = (F.col("doc_id") % 37).cast("string")
        x = (F.col("doc_id") % 9 + 1).cast("string")
        y = (F.col("doc_id") % 10).cast("string")
        n = (F.col("doc_id") % 90 + 1).cast("string")
        p = (F.col("doc_id") % 40).cast("string")
        text = F.concat(
            F.lit("Entity_"), a, F.lit(" reported revenue of $"), x,
            F.lit("."), y, F.lit(" billion. "),
            F.lit("Entity_"), a, F.lit(" employs "), n, F.lit(",500 people. "),
            F.lit("Entity_"), a, F.lit(" margin was "), p, F.lit(".5%."),
        )
        chunks = d.select(
            F.concat(F.lit("u"), F.col("doc_id").cast("string")).alias("url"),
            text.alias("text_chunk"),
        )
        return extract_quantity_facts(chunks)

    q["quantity_facts"] = quantity

    def breadcrumbs(spark, sf):
        # Breadcrumb taxonomy mining (structured.py::breadcrumb_taxonomy):
        # each closed-form page carries a 3-crumb trail (anchor, anchor,
        # span) plus a non-breadcrumb decoy nav that must be ignored.
        from aiwhispr_spark.operators.structured import breadcrumb_taxonomy

        d = _t(spark, sf, "documents").select("doc_id")
        a = (F.col("doc_id") % 6).cast("string")
        b = (F.col("doc_id") % 4).cast("string")
        c = (F.col("doc_id") % 30).cast("string")
        html = F.concat(
            F.lit('<nav class="menu"><a href="/x">Decoy</a>'
                  '<a href="/y">Other</a></nav>'),
            F.lit('<nav class="breadcrumb"><a href="/c">Cat'), a,
            F.lit('</a> &gt; <a href="/s">Sub'), a, F.lit("_"), b,
            F.lit("</a> &gt; <span>Item"), c, F.lit("</span></nav>"),
        )
        docs = d.select(
            F.concat(F.lit("u"), F.col("doc_id").cast("string")).alias("url"),
            F.encode(html, "UTF-8").alias("html"),
        )
        return breadcrumb_taxonomy(docs)

    q["breadcrumb_taxonomy"] = breadcrumbs

    def geo_pairs(spark, sf):
        # Geo proximity join (geo.py::grid_nearby_pairs): 50 clusters of 10
        # points each (3000 µ° apart, ±199 µ° jitter) with radius 150 —
        # the grid blocking must find exactly the brute-force pair set
        # (jitter spread exceeds the radius, so the verify filter bites;
        # clusters straddle negative coordinates).
        from aiwhispr_spark.operators.geo import grid_nearby_pairs

        d = _t(spark, sf, "documents").select("doc_id")
        lat = (F.col("doc_id") % 10) * 3000 - 15000 + (F.col("doc_id") * 7) % 200
        lon = (
            F.expr("(doc_id div 10) % 5") * 3000 - 7500
            + (F.col("doc_id") * 13) % 200
        )
        pts = d.select(
            F.col("doc_id").alias("id"),
            lat.cast("long").alias("lat_u"),
            lon.cast("long").alias("lon_u"),
        )
        return grid_nearby_pairs(pts, 150)

    q["geo_nearby_pairs"] = geo_pairs

    def redirects_q(spark, sf):
        # Redirect-chain resolution (redirects.py::resolve_redirects,
        # pointer halving — log2 rounds, never per-hop walks): closed-form
        # redirect map over documents: doc_id%7 in (1,2,3) chain one hop
        # down (u_i -> u_{i-1}, terminal at %7==0); %7==5/6 form 2-cycles.
        # Oracle computes finals/hops/cycle flags from the same arithmetic
        # (the %7==5 boundary partner existence via LEFT JOIN, so it stays
        # correct if the doc-id range ever changes).
        from aiwhispr_spark.operators.redirects import resolve_redirects

        d = _t(spark, sf, "documents").select("doc_id")
        m = F.col("doc_id") % 7

        def u(col):
            return F.concat(F.lit("u"), col.cast("string"))

        chain = d.filter(m.isin(1, 2, 3)).select(
            u(F.col("doc_id")).alias("src"), u(F.col("doc_id") - 1).alias("dst")
        )
        cyc5 = d.filter(m == 5).select(
            u(F.col("doc_id")).alias("src"), u(F.col("doc_id") + 1).alias("dst")
        )
        cyc6 = d.filter(m == 6).select(
            u(F.col("doc_id")).alias("src"), u(F.col("doc_id") - 1).alias("dst")
        )
        edges = chain.unionByName(cyc5).unionByName(cyc6)
        # fixture chains are <= 3 hops; max_chain=8 -> 3 halving rounds
        # (the bound is a query parameter, same as max_hops in the closures)
        return resolve_redirects(edges, max_chain=8)

    q["redirect_resolution"] = redirects_q

    def hearst_q(spark, sf):
        # Hearst hypernym mining (hearst.py::extract_hearst_hypernyms):
        # closed-form prose per doc exercises the Oxford 3-list (even ids),
        # the two-item 'and' list (odd ids), a multi-word 'and other'
        # mention, and a lowercase decoy that must not match.  Oracle =
        # the expected rows from doc-id arithmetic — independent of every
        # regex in the operator.
        from aiwhispr_spark.operators.hearst import extract_hearst_hypernyms

        d = _t(spark, sf, "documents").select("doc_id")
        i = F.col("doc_id")
        sent_a = F.when(
            i % 2 == 0,
            F.concat(
                F.lit("Tools such as Acme"), (i % 7).cast("string"),
                F.lit(", Beta"), (i % 5).cast("string"),
                F.lit(", and Gamma"), (i % 3).cast("string"),
                F.lit(" ship."),
            ),
        ).otherwise(
            F.concat(
                F.lit("Tools such as Acme"), (i % 7).cast("string"),
                F.lit(" and Beta"), (i % 5).cast("string"),
                F.lit(" ship."),
            )
        )
        text = F.concat(
            sent_a,
            F.lit(" New Corp"), (i % 4).cast("string"),
            F.lit(" and other vendors lead. They ship such as promised."),
        )
        chunks = d.select(
            F.concat(F.lit("u"), i.cast("string")).alias("url"),
            text.alias("text_chunk"),
        )
        return extract_hearst_hypernyms(chunks)

    q["hearst_hypernyms"] = hearst_q

    def horn_rules_q(spark, sf):
        # AMIE-style horn-rule mining (rulemine.py::mine_horn_rules) over a
        # closed-form KG: works_for ∘ located_in supports TWO planted heads
        # with different agreement rates (lives_in: k%4 disagrees and k%5==4
        # people have NO fact, so PCA > standard confidence; based_in: k%3
        # disagrees, complete ⇒ PCA = standard), plus a capital_of layer
        # whose wedges have zero support and must not emit.  Oracle =
        # the same facts rebuilt in SQL + an independent re-derivation of
        # the mining joins (support/conf/hc/PCA).
        from aiwhispr_spark.operators.rulemine import mine_horn_rules

        d = _t(spark, sf, "documents").select(
            (F.col("doc_id") % 40).alias("k"),
            (F.col("doc_id") % 8).alias("j"),
            (F.col("doc_id") % 5).alias("t"),
        )

        def s(pre, c):
            return F.concat(F.lit(pre), c.cast("string"))

        k, j, t = F.col("k"), F.col("j"), F.col("t")
        works = d.select(
            s("P", k).alias("subj"), F.lit("works_for").alias("pred"),
            s("C", k % 8).alias("obj"),
        )
        located = d.select(
            s("C", j).alias("subj"), F.lit("located_in").alias("pred"),
            s("T", j % 5).alias("obj"),
        )
        capital = d.select(
            s("T", t).alias("subj"), F.lit("capital_of").alias("pred"),
            s("X", t % 2).alias("obj"),
        )
        lives = d.where(k % 5 != 4).select(
            s("P", k).alias("subj"), F.lit("lives_in").alias("pred"),
            s("T", F.when(k % 4 != 0, (k % 8) % 5).otherwise(((k % 8) + 1) % 5)).alias("obj"),
        )
        based = d.select(
            s("P", k).alias("subj"), F.lit("based_in").alias("pred"),
            s("T", F.when(k % 3 != 0, (k % 8) % 5).otherwise(((k % 8) + 2) % 5)).alias("obj"),
        )
        triples = (
            works.unionByName(located).unionByName(capital)
            .unionByName(lives).unionByName(based)
        )
        return mine_horn_rules(triples, min_support=2)

    q["kg_horn_rules"] = horn_rules_q

    def type_violations_q(spark, sf):
        # Ontology violation detection (ontology.py::
        # type_constraint_violations): works_for points at a place for
        # k%7==0 (minority vs the (person, org) dominant), lives_at has a
        # 10-10 signature TIE broken on type name (person < unknown), and
        # located_in is fully consistent (must emit nothing).  Z entities
        # are absent from the types table (unknown arm).  Oracle rebuilds
        # facts+types closed-form and re-derives election + violations.
        from aiwhispr_spark.operators.ontology import type_constraint_violations

        d = _t(spark, sf, "documents").select(
            (F.col("doc_id") % 30).alias("k")
        ).distinct()

        def s(pre, c):
            return F.concat(F.lit(pre), c.cast("string"))

        k = F.col("k")
        works = d.select(
            s("P", k).alias("subj"), F.lit("works_for").alias("pred"),
            F.when(k % 7 == 0, s("T", k % 4)).otherwise(s("C", k % 6)).alias("obj"),
        )
        located = d.select(
            s("C", k % 6).alias("subj"), F.lit("located_in").alias("pred"),
            s("T", (k % 6) % 4).alias("obj"),
        )
        lives_z = d.where(k % 3 == 0).select(
            s("Z", k).alias("subj"), F.lit("lives_at").alias("pred"),
            s("T", k % 4).alias("obj"),
        )
        lives_p = d.where(k % 3 == 1).select(
            s("P", k).alias("subj"), F.lit("lives_at").alias("pred"),
            s("T", k % 4).alias("obj"),
        )
        facts = works.unionByName(located).unionByName(lives_z).unionByName(lives_p)
        types = (
            d.select(s("P", k).alias("entity"), F.lit("person").alias("etype"))
            .unionByName(d.select(s("C", k % 6).alias("entity"), F.lit("org").alias("etype")))
            .unionByName(d.select(s("T", k % 4).alias("entity"), F.lit("place").alias("etype")))
            .distinct()
        )
        return type_constraint_violations(facts, types)

    q["kg_type_violations"] = type_violations_q

    def pagination_q(spark, sf):
        # Pagination stitching (pagination.py): even page-groups are 5-page
        # rel=next chains (attr order alternates per page), odd groups are
        # singletons; every page carries a rel=prev decoy.  Oracle = the
        # series rebuilt closed-form from group arithmetic.
        from aiwhispr_spark.operators.pagination import (
            reassemble_series,
            stitch_pagination,
        )

        d = _t(spark, sf, "documents").select(
            (F.col("doc_id") % 50).alias("m")
        ).distinct()
        m = F.col("m")
        nxt = F.concat(F.lit("u"), (m + 1).cast("string"))
        next_tag = F.when(
            m % 2 == 0,
            F.concat(F.lit('<link rel="next" href="'), nxt, F.lit('">')),
        ).otherwise(F.concat(F.lit('<link href="'), nxt, F.lit('" rel="next">')))
        html = F.concat(
            F.lit('<link rel="prev" href="decoy">'),
            # even 5-group  <=>  m % 10 < 5 (pure modular, no division cast)
            F.when((m % 10 < 5) & (m % 5 < 4), next_tag).otherwise(F.lit("")),
        )
        pages = d.select(
            F.concat(F.lit("u"), m.cast("string")).alias("url"),
            html.alias("html"),
            F.concat(F.lit("T"), m.cast("string")).alias("text"),
        )
        return reassemble_series(stitch_pagination(pages, max_chain=8))

    q["pagination_series"] = pagination_q

    def canonical_clusters_q(spark, sf):
        # rel=canonical election (canonicallink.py): 10 three-page clusters
        # with an in-corpus head keeper, 10 singleton clusters pointing at
        # UNCRAWLED targets (min-member keeper), attr order alternating,
        # rel=alternate decoys everywhere.  Oracle = closed-form rows.
        from aiwhispr_spark.operators.canonicallink import canonical_clusters

        d = _t(spark, sf, "documents").select(
            (F.col("doc_id") % 40).alias("m")
        ).distinct()
        m = F.col("m")
        head = F.concat(F.lit("u"), (m - m % 4).cast("string"))
        ext = F.concat(F.lit("x"), m.cast("string"))
        target = F.when(m % 4 == 3, ext).otherwise(head)
        canon_tag = F.when(
            m % 2 == 0,
            F.concat(F.lit('<link rel="canonical" href="'), target, F.lit('">')),
        ).otherwise(
            F.concat(F.lit('<link href="'), target, F.lit('" rel="canonical">'))
        )
        html = F.concat(
            F.lit('<link rel="alternate" href="decoy">'),
            F.when(m % 4 != 0, canon_tag).otherwise(F.lit("")),
        )
        pages = d.select(
            F.concat(F.lit("u"), m.cast("string")).alias("url"),
            html.alias("html"),
        )
        return canonical_clusters(pages)

    q["canonical_clusters"] = canonical_clusters_q

    def salience_q(spark, sf):
        # Entity salience (salience.py::entity_salience) composed over the
        # REAL gazetteer tagger output on the documents text — frequency ×
        # damped earliness as an exact integer, per-doc rank window.
        # Oracle extends the gazetteer rollup SQL with the same formula.
        from aiwhispr_spark.operators.gazetteer import tag_gazetteer
        from aiwhispr_spark.operators.salience import entity_salience

        gaz = spark.createDataFrame(_GAZETTEER, "surface string, etype string")
        m = tag_gazetteer(_t(spark, sf, "documents"), gaz)
        return entity_salience(m)

    q["entity_salience"] = salience_q

    def _hreflang_pages(spark, sf):
        # shared closed-form translation families: page per doc_id with
        # group g = doc_id div 3, lang by doc_id % 3 (de/en/fr); every page
        # declares all three alternates with a DIFFERENT attribute order
        # per tag (the any-order contract) plus a stylesheet decoy.  The
        # last group may be partial (target-only-member path).
        d = _t(spark, sf, "documents").select("doc_id")
        i = F.col("doc_id")
        g = F.expr("doc_id div 3").cast("string")
        m = i % 3
        base = F.concat(F.lit("https://ex.org/g"), g, F.lit("/"))
        lang = F.when(m == 0, "de").when(m == 1, "en").otherwise("fr")
        tag_de = F.concat(
            F.lit('<link rel="alternate" hreflang="de" href="'), base, F.lit('de">')
        )
        tag_en = F.concat(
            F.lit('<link href="'), base, F.lit('en" rel="alternate" hreflang="en">')
        )
        tag_fr = F.concat(
            F.lit('<link hreflang="fr" href="'), base, F.lit('fr" rel="alternate">')
        )
        html = F.concat(
            F.lit("<html><head>"), tag_de, tag_en, tag_fr,
            F.lit('<link rel="stylesheet" href="s.css"></head></html>'),
        )
        return d.select(
            F.concat(base, lang).alias("url"),
            html.alias("html"),
            lang.alias("lang"),
            g.alias("g"),
        )

    def hreflang_q(spark, sf):
        # hreflang alternate clusters (hreflang.py::hreflang_clusters) over
        # the shared closed-form families.  Oracle = groups x langs from
        # doc-id arithmetic.
        from aiwhispr_spark.operators.hreflang import hreflang_clusters

        return hreflang_clusters(_hreflang_pages(spark, sf).select("url", "html"))

    q["hreflang_clusters"] = hreflang_q

    def crosslingual_q(spark, sf):
        # Cross-lingual alias mining (crosslingual.py::cross_lingual_aliases)
        # composed over the REAL hreflang clustering: per page, one
        # language-INVARIANT fact (founded -> Y<g>, the anchor) and one
        # language-VARIANT fact (hq -> C_<lang><g>, must contribute
        # nothing).  Expected pairs = lang pairs PRESENT per group (the
        # partial last group exercises the 2-lang case); target-only
        # cluster members have no triples and stay silent.
        from aiwhispr_spark.operators.crosslingual import cross_lingual_aliases
        from aiwhispr_spark.operators.hreflang import hreflang_clusters

        pages = _hreflang_pages(spark, sf)
        members = hreflang_clusters(pages.select("url", "html"))
        subj = F.concat(F.lit("Name_"), F.col("lang"), F.lit("_"), F.col("g"))
        inv = pages.select(
            "url", subj.alias("subj"), F.lit("founded").alias("pred"),
            F.concat(F.lit("Y"), F.col("g")).alias("obj"),
        )
        var = pages.select(
            "url", subj.alias("subj"), F.lit("hq").alias("pred"),
            F.concat(F.lit("C_"), F.col("lang"), F.col("g")).alias("obj"),
        )
        return cross_lingual_aliases(members, inv.unionByName(var))

    q["crosslingual_aliases"] = crosslingual_q

    def microdata_q(spark, sf):
        # schema.org microdata mining (structured.py::microdata_triples):
        # closed-form pages carry a Person scope (text + content-attr
        # values), an Organization scope, and a nameless Thing scope that
        # must emit nothing.  Oracle = expected rows from doc-id arithmetic
        # — independent of the scope/property regexes.
        from aiwhispr_spark.operators.structured import microdata_triples

        d = _t(spark, sf, "documents").select("doc_id")
        i = F.col("doc_id")

        def s(x):
            return x.cast("string")

        html = F.concat(
            F.lit('<html><body><div itemscope itemtype="https://schema.org/Person">'
                  '<span itemprop="name">Person'),
            s(i % 11),
            F.lit('</span><span itemprop="jobTitle">Engineer'),
            s(i % 3),
            F.lit('</span><meta itemprop="birthDate" content="19'),
            s(F.lit(50) + i % 40),
            F.lit('-01-01"></div>'
                  '<div itemscope itemtype="https://schema.org/Organization">'
                  '<span itemprop="name">Org'),
            s(i % 13),
            F.lit('</span><span itemprop="location">City'),
            s(i % 5),
            F.lit('</span></div>'
                  '<div itemscope itemtype="https://schema.org/Thing">'
                  '<span itemprop="label">NoName</span></div></body></html>'),
        )
        docs = d.select(
            F.concat(F.lit("u"), s(i)).alias("url"),
            F.encode(html, "UTF-8").alias("html"),
        )
        return microdata_triples(docs)

    q["microdata_triples"] = microdata_q

    def rdfa_q(spark, sf):
        # RDFa-lite mining (structured.py::rdfa_triples): closed-form pages
        # carry a CURIE-typed Person scope (text + content-attr values), an
        # IRI-typed Organization section, and a nameless Thing scope that
        # must emit nothing.  Oracle = expected rows from doc-id arithmetic
        # — independent of the scope/property regexes.
        from aiwhispr_spark.operators.structured import rdfa_triples

        d = _t(spark, sf, "documents").select("doc_id")
        i = F.col("doc_id")

        def s(x):
            return x.cast("string")

        html = F.concat(
            F.lit('<html><body>'
                  '<div vocab="https://schema.org/" typeof="schema:Person">'
                  '<span property="name">Agent'),
            s(i % 9),
            F.lit('</span><span property="jobTitle">Analyst'),
            s(i % 4),
            F.lit('</span><meta property="birthDate" content="19'),
            s(F.lit(60) + i % 30),
            F.lit('-02-02"></div>'
                  '<section typeof="https://schema.org/Organization">'
                  '<span property="name">Co'),
            s(i % 12),
            F.lit('</span><span property="location">Town'),
            s(i % 6),
            F.lit('</span></section>'
                  '<div typeof="schema:Thing">'
                  '<span property="label">NoName</span></div></body></html>'),
        )
        docs = d.select(
            F.concat(F.lit("u"), s(i)).alias("url"),
            F.encode(html, "UTF-8").alias("html"),
        )
        return rdfa_triples(docs)

    q["rdfa_triples"] = rdfa_q

    def orc_roundtrip(spark, sf):
        # ORC source/sink (sources/orcsrc.py): closed-form frame with
        # unicode text, embedded quotes/newlines, NULL langs and a negative
        # id writes to a dir of ORC files and reads back — DuckDB cannot
        # read ORC, so the oracle recomputes the rows from the arithmetic
        # alone; any write/read corruption breaks the value hash.
        from aiwhispr_spark.sources import orcsrc
        from aiwhispr_spark.sources.orcsrc import read_orc, write_orc_fixture

        path = _fixture_path("aiwhispr_orc_300", orcsrc)
        write_orc_fixture(spark, path)
        df = read_orc(spark, path)
        return df.select(
            "doc_id",
            "lang",
            F.length("text").cast("long").alias("n_chars"),
            F.md5("text").alias("text_md5"),
            F.round(F.col("score") * 10000).cast("long").alias("score_i"),
        )

    q["orc_roundtrip"] = orc_roundtrip

    def shacl_q(spark, sf):
        # SHACL-lite validation (shapes.py::shape_violations): closed-form
        # KG over k = doc_id % 24 — persons always work_for one org, extras
        # on k%5==0 (max_count), a place-typed employer on k%7==0
        # (class_range), missing email on k%3==0 (min_count 0), an
        # undeclared nickname on k%4==0 (closed), and C2 with three
        # located_in objects (max 2).  Oracle EMITS the expected violations
        # from the arithmetic — independent of the validator's joins.
        from aiwhispr_spark.operators.shapes import shape_violations

        ks = (
            _t(spark, sf, "documents")
            .select((F.col("doc_id") % 24).alias("k"))
            .distinct()
        )
        k = F.col("k")

        def s(x):
            return x.cast("string")

        P = F.concat(F.lit("P"), s(k))
        wf = F.lit("works_for").alias("pred")
        facts = (
            ks.select(P.alias("subj"), wf, F.concat(F.lit("C"), s(k % 6)).alias("obj"))
            .unionByName(
                ks.filter(k % 5 == 0).select(
                    P.alias("subj"), wf,
                    F.concat(F.lit("C"), s((k + 1) % 6)).alias("obj"),
                )
            )
            .unionByName(
                ks.filter(k % 7 == 0).select(
                    P.alias("subj"), wf,
                    F.concat(F.lit("T"), s(k % 4)).alias("obj"),
                )
            )
            .unionByName(
                ks.filter(k % 3 != 0).select(
                    P.alias("subj"), F.lit("email").alias("pred"),
                    F.concat(F.lit("E"), s(k)).alias("obj"),
                )
            )
            .unionByName(
                ks.filter(k % 4 == 0).select(
                    P.alias("subj"), F.lit("nickname").alias("pred"),
                    F.concat(F.lit("N"), s(k)).alias("obj"),
                )
            )
        )
        cs = ks.select((k % 6).alias("c")).distinct()
        c = F.col("c")
        C = F.concat(F.lit("C"), s(c))
        li = F.lit("located_in").alias("pred")
        facts = facts.unionByName(
            cs.select(C.alias("subj"), li, F.concat(F.lit("T"), s(c % 4)).alias("obj"))
        ).unionByName(
            cs.filter(c == 2).select(
                C.alias("subj"), li,
                F.explode(F.array(F.lit("T0"), F.lit("T1"))).alias("obj"),
            )
        )
        types = (
            ks.select(P.alias("entity"), F.lit("person").alias("etype"))
            .unionByName(cs.select(C.alias("entity"), F.lit("org").alias("etype")))
            .unionByName(
                ks.select((k % 4).alias("t"))
                .distinct()
                .select(
                    F.concat(F.lit("T"), s(F.col("t"))).alias("entity"),
                    F.lit("place").alias("etype"),
                )
            )
        )
        shapes = spark.createDataFrame(
            [
                ("person", "works_for", 1, 1, "org"),
                ("person", "email", 1, None, None),
                ("org", "located_in", 0, 2, "place"),
            ],
            "etype string, pred string, min_count int, max_count int, obj_etype string",
        )
        return shape_violations(facts, types, shapes)

    q["kg_shacl_violations"] = shacl_q

    def zorder_q(spark, sf):
        # Z-order layout (layout.py::zorder_bucket_stats): Morton keys over
        # (x, y) points derived from o_orderkey, bucketed by the top z bits
        # (the pure-arithmetic stand-in for 'file'), per-bucket bounding
        # rectangles + box-pruning stats.  The DuckDB oracle re-derives the
        # interleave with the same shift/mask cascade — one wrong bit in
        # the spread breaks the hash.
        from aiwhispr_spark.operators.layout import zorder_bucket_stats

        pts = _t(spark, sf, "orders").select(
            (F.col("o_orderkey") % 1024).alias("x"),
            ((F.col("o_orderkey") * 7 + 13) % 1024).alias("y"),
        )
        return zorder_bucket_stats(
            pts, "x", "y", shift=14, box=(100, 300, 400, 600)
        )

    q["zorder_bucket_pruning"] = zorder_q

    def jw_q(spark, sf):
        # Jaro-Winkler name comparator (namesim.py): four pair kinds per
        # k — internal transposition, truncation, disjoint name, trailing
        # transposition — scored by the Arrow-batched python comparator vs
        # DuckDB's INDEPENDENT jaro_winkler_similarity implementation
        # (byte-level semantics, 0.7 boost threshold, prefix cap 4).
        from aiwhispr_spark.operators.namesim import jw_i

        ks = (
            _t(spark, sf, "documents")
            .select((F.col("doc_id") % 24).alias("k"))
            .distinct()
        )
        s = F.col("k").cast("string")
        acme = F.concat(F.lit("Acme Corporation "), s)
        pairs = (
            ks.select(
                "k", F.lit(0).alias("kind"), acme.alias("a"),
                F.concat(F.lit("Acme Corporatoin "), s).alias("b"),
            )
            .unionByName(ks.select(
                "k", F.lit(1).alias("kind"), acme.alias("a"),
                F.concat(F.lit("Acme Corp "), s).alias("b"),
            ))
            .unionByName(ks.select(
                "k", F.lit(2).alias("kind"), acme.alias("a"),
                F.concat(F.lit("Zenith Widgets "), s).alias("b"),
            ))
            .unionByName(ks.select(
                "k", F.lit(3).alias("kind"),
                F.concat(F.lit("Entity "), s, F.lit(" GmbH")).alias("a"),
                F.concat(F.lit("Entity "), s, F.lit(" Gmhb")).alias("b"),
            ))
        )
        return pairs.select("k", "kind", jw_i(F.col("a"), F.col("b")).alias("jw_i"))

    q["jaro_winkler_scores"] = jw_q

    def paraphrase_q(spark, sf):
        # Predicate paraphrases (paraphrase.py::predicate_paraphrases):
        # closed-form relations over 20 entity pairs — 'bought' mirrors
        # 'acquired' on residues < 15, 'partnered_with' on residues >= 10,
        # 'owns' points at a disjoint object space (must pair with nothing).
        # Repeats of every triple across doc_ids pin the distinct collapse.
        from aiwhispr_spark.operators.paraphrase import predicate_paraphrases

        d = _t(spark, sf, "documents").select("doc_id")
        r = (F.col("doc_id") % 20).cast("string")
        subj = F.concat(F.lit("E"), r)
        obj = F.concat(F.lit("E"), ((F.col("doc_id") + 7) % 20).cast("string"))
        acq = d.select(subj.alias("subj"), F.lit("acquired").alias("pred"), obj.alias("obj"))
        bought = d.filter(F.col("doc_id") % 20 < 15).select(
            subj.alias("subj"), F.lit("bought").alias("pred"), obj.alias("obj")
        )
        part = d.filter(F.col("doc_id") % 20 >= 10).select(
            subj.alias("subj"), F.lit("partnered_with").alias("pred"), obj.alias("obj")
        )
        owns = d.select(
            subj.alias("subj"), F.lit("owns").alias("pred"),
            F.concat(F.lit("F"), r).alias("obj"),
        )
        t = acq.unionByName(bought).unionByName(part).unionByName(owns)
        return predicate_paraphrases(t)

    q["kg_predicate_paraphrases"] = paraphrase_q

    def kg_diff(spark, sf):
        # KG snapshot diffing (temporal.py::kg_snapshot_diff): old/new
        # triple sets built closed-form over 40 entities — a%5==0 moves HQ
        # (functional change, paired), a%7==0 loses its owns edge (removed),
        # a%3==0 gains a ceo fact (added).  Oracle EMITS the expected delta
        # directly from the arithmetic (no diff re-implementation).
        from aiwhispr_spark.operators.temporal import kg_snapshot_diff

        ents = (
            _t(spark, sf, "documents")
            .select((F.col("doc_id") % 40).alias("a"))
            .distinct()
        )
        e = F.concat(F.lit("E"), F.col("a").cast("string"))
        city_old = F.concat(F.lit("City"), ((F.col("a") * 3) % 13).cast("string"))
        city_new = F.concat(
            F.lit("City"),
            F.when(F.col("a") % 5 == 0, (F.col("a") * 3) % 13 + 1)
            .otherwise((F.col("a") * 3) % 13)
            .cast("string"),
        )
        sub = F.concat(F.lit("Sub"), ((F.col("a") * 5) % 11).cast("string"))
        ceo = F.concat(F.lit("Person"), ((F.col("a") * 2) % 7).cast("string"))
        old = ents.select(
            e.alias("subj"), F.lit("based_in").alias("pred"), city_old.alias("obj")
        ).unionByName(
            ents.select(e.alias("subj"), F.lit("owns").alias("pred"), sub.alias("obj"))
        )
        new = (
            ents.select(
                e.alias("subj"),
                F.lit("based_in").alias("pred"),
                city_new.alias("obj"),
            )
            .unionByName(
                ents.where(F.col("a") % 7 != 0).select(
                    e.alias("subj"), F.lit("owns").alias("pred"), sub.alias("obj")
                )
            )
            .unionByName(
                ents.where(F.col("a") % 3 == 0).select(
                    e.alias("subj"), F.lit("ceo").alias("pred"), ceo.alias("obj")
                )
            )
        )
        return kg_snapshot_diff(old, new)

    q["kg_snapshot_diff"] = kg_diff

    def kg_coref(spark, sf):
        # Pronoun-coreference resolution with negation guard (operators/
        # coref.py): 5-sentence docs built closed-form from doc_id — s1's
        # "It" resolves across s0, s4's "She" resolves PAST the negated s2
        # to s3's anchor; the never-based_in sentence must NOT emit.
        # Oracle = the expected two triples per doc from arithmetic alone.
        from aiwhispr_spark.operators.coref import pronoun_resolved_triples

        d = _t(spark, sf, "documents").select("doc_id")
        a = (F.col("doc_id") % 37).cast("string")
        b = (F.col("doc_id") % 11).cast("string")
        c = ((F.col("doc_id") * 3) % 13).cast("string")
        p = (F.col("doc_id") % 7).cast("string")
        dd = ((F.col("doc_id") * 5) % 9).cast("string")
        text = F.concat(
            F.lit("Entity_"), a, F.lit(" acquired E"), b, F.lit(" Corp. "),
            F.lit("It is based in City"), c, F.lit(". "),
            F.lit("It was never based in Badtown. "),
            F.lit("Person"), p, F.lit(" works for Entity_"), a, F.lit(". "),
            F.lit("She acquired Asset"), dd, F.lit("."),
        )
        chunks = d.select(
            F.concat(F.lit("u"), F.col("doc_id").cast("string")).alias("url"),
            text.alias("text_chunk"),
        )
        return pronoun_resolved_triples(chunks)

    q["kg_pronoun_coref"] = kg_coref

    def kg_fact_rank(spark, sf):
        # Entity summarization (kgsummary.py::fact_informativeness): each
        # entity's top-3 facts by (pred, obj) IDF over subjects — one ln of
        # one exact-integer division (pmi discipline), subject-partitioned
        # window, deterministic tie-breaks.
        from aiwhispr_spark.operators.kgsummary import fact_informativeness

        return fact_informativeness(_corpus_triples(spark), top_k=3)

    q["kg_fact_rank"] = kg_fact_rank

    def kg_related_entities(spark, sf):
        # Related-entity panel (kgsummary.py::entity_comention_pmi):
        # page-level co-mention PMI over exact BIGINT page counts; the pair
        # join is url-keyed over the DISTINCT (url, entity) mention table.
        from aiwhispr_spark.functions.udfs import extract_triples_df
        from aiwhispr_spark.operators.kgsummary import entity_comention_pmi
        from aiwhispr_spark.plans.kg_pipeline import docs_to_chunks

        docs = spark.read.parquet(_ensure_simple_corpus())
        t = extract_triples_df(docs_to_chunks(docs)).select(
            "url", "subj", "pred", "obj"
        )
        return entity_comention_pmi(t, min_pages=2)

    q["kg_related_entities"] = kg_related_entities

    def kg_bgp_chain(spark, sf):
        # KG query layer: SPARQL-style basic graph pattern over the corpus
        # triple store — acquirers ?y of entities ?x that employ ?p and are
        # based in ?city.  Gates the pattern→scan compilation and the
        # shared-variable join order (operators/graph_query.py::bgp_match);
        # oracle = the same conjunctive self-joins in SQL.
        from aiwhispr_spark.operators.graph_query import bgp_match

        t = _corpus_triples(spark)
        out = bgp_match(
            t,
            [
                ("?y", "acquired", "?x"),
                ("?x", "works_for", "?p"),
                ("?x", "based_in", "?city"),
            ],
        )
        return out.select("x", "p", "city", "y")

    q["kg_bgp_chain"] = kg_bgp_chain

    def kg_bgp_optional(spark, sf):
        # SPARQL OPTIONAL (graph_query.py::bgp_match_optional): acquisitions
        # (?y acquired ?x) keep their bindings even when the acquired entity
        # has no known location or founder — each optional group left-joins
        # on the shared ?x, NULLs survive.  Oracle = the same LEFT JOIN
        # chain in SQL.
        from aiwhispr_spark.operators.graph_query import bgp_match_optional

        t = _corpus_triples(spark)
        out = bgp_match_optional(
            t,
            [("?y", "acquired", "?x")],
            [
                [("?x", "based_in", "?city")],
                [("?x", "founded_by", "?f")],
            ],
        )
        return out.select("x", "y", "city", "f")

    q["kg_bgp_optional"] = kg_bgp_optional

    def kg_bgp_minus(spark, sf):
        # SPARQL MINUS (graph_query.py::bgp_match_minus): acquisitions
        # (?y acquired ?x) MINUS entities with a known location MINUS
        # entities with a known founder — each group one left-anti join on
        # the shared ?x (bindings never NULL, so MINUS ≡ NOT EXISTS in this
        # subset).  Oracle = the same double NOT EXISTS in SQL.
        from aiwhispr_spark.operators.graph_query import bgp_match_minus

        t = _corpus_triples(spark)
        out = bgp_match_minus(
            t,
            [("?y", "acquired", "?x")],
            [
                [("?x", "based_in", "?city")],
                [("?x", "founded_by", "?f")],
            ],
        )
        return out.select("x", "y")

    q["kg_bgp_minus"] = kg_bgp_minus

    def kg_property_path(spark, sf):
        # SPARQL property-path subset (graph_query.py::property_path):
        # ^founded_by/(owns|acquired)+/based_in — founders to the locations
        # of companies their company transitively owns/acquired.  One query
        # exercises inverse, alternation, bounded +, and sequence; oracle =
        # predicate-filtered joins around the recursive-CTE closure.
        from aiwhispr_spark.operators.graph_query import property_path

        t = _corpus_triples(spark)
        return property_path(t, "^founded_by/(owns|acquired)+/based_in", max_hops=4)

    q["kg_property_path"] = kg_property_path

    def kg_transitive_closure(spark, sf):
        # KG query layer: 4-hop ownership/acquisition reachability with
        # MINIMUM hop counts — frontier BFS with per-hop materialization and
        # visited-set anti-join (operators/graph_query.py::transitive_closure);
        # oracle = DuckDB recursive CTE + min(hops) GROUP BY.
        from aiwhispr_spark.operators.graph_query import transitive_closure

        t = _corpus_triples(spark)
        edges = t.filter(F.col("pred").isin("owns", "acquired")).select(
            F.col("subj").alias("src"), F.col("obj").alias("dst")
        )
        return transitive_closure(edges, max_hops=4)

    q["kg_transitive_closure"] = kg_transitive_closure

    def kg_triangles(spark, sf):
        # KG query layer: undirected triangle enumeration (a<b<c, each once)
        # over the entity-entity predicates — direction/multiplicity erased
        # by the canonical least/greatest edge build, then the ordered
        # 3-join (operators/graph_query.py::triangle_enumerate).
        from aiwhispr_spark.operators.graph_query import triangle_enumerate

        t = _corpus_triples(spark)
        edges = t.filter(
            F.col("pred").isin("acquired", "owns", "partnered_with")
        ).select(F.col("subj").alias("src"), F.col("obj").alias("dst"))
        return triangle_enumerate(edges)

    q["kg_triangles"] = kg_triangles

    def kg_entity_types(spark, sf):
        # KG query layer: rule-based entity typing mixing relational evidence
        # (predicate positions: based_in/located_in object ⇒ place,
        # founded_by/works_for object ⇒ person) with surface evidence (corp
        # suffix ⇒ org, two-capitalized-words ⇒ person), fixed precedence —
        # one groupBy + CASE, no python (operators/graph_query.py).
        from aiwhispr_spark.operators.graph_query import type_entities

        return type_entities(_corpus_triples(spark))

    q["kg_entity_types"] = kg_entity_types

    def kg_pred_profile(spark, sf):
        # Schema/ontology induction (graph_query.py::predicate_profile): the
        # observed domain/range signature of every predicate — triples joined
        # twice against the induced (entity, etype) table, one map-side-
        # combinable aggregate on the ~|preds|·|types|² key space.
        from aiwhispr_spark.operators.graph_query import predicate_profile

        return predicate_profile(_corpus_triples(spark))

    q["kg_predicate_profile"] = kg_pred_profile

    def warc_roundtrip(spark, sf):
        # WARC source (sources/warc.py): the simple corpus sharded into 3
        # per-record-gzipped Common-Crawl-layout WARC files, read back via
        # binaryFile → mapInPandas record parsing.  Value gate: every (url,
        # timestamp, html bytes) must round-trip byte-exactly — the oracle
        # reads the ORIGINAL parquet, so any parser drift (header parsing,
        # http-payload split, ts format, gzip membering) hash-mismatches.
        from aiwhispr_spark.sources.warc import read_warc

        return read_warc(spark, _ensure_simple_corpus_warc()).select(
            "url",
            F.date_format("warc_ts", "yyyy-MM-dd HH:mm:ss").alias("ts_s"),
            F.md5(F.decode("html", "UTF-8")).alias("html_md5"),
            F.length("html").cast("long").alias("n_bytes"),
        )

    q["warc_roundtrip_extract"] = warc_roundtrip

    def line_dedup(spark, sf):
        # CCNet-style corpus-level line dedup (operators/linededup.py): lines
        # appearing in ≥3 distinct docs (the <html>/<body> wrappers in all
        # docs, the fish&chips boilerplate paragraph in every 3rd) are
        # dropped, survivors reassembled in order.  Oracle = same normalize/
        # count/drop/reassemble in SQL; md5 of the reassembled text gates
        # byte-exact reassembly.
        from aiwhispr_spark.operators.linededup import drop_boilerplate_lines

        docs = spark.read.parquet(_ensure_simple_corpus()).select(
            F.col("url").alias("doc_id"), F.decode("html", "UTF-8").alias("text")
        )
        out = drop_boilerplate_lines(docs, min_docs=3)
        return out.select(
            "doc_id",
            F.md5("text_clean").alias("clean_md5"),
            F.col("n_kept").cast("long").alias("n_kept"),
            F.col("n_dropped").cast("long").alias("n_dropped"),
        )

    q["line_dedup_boilerplate"] = line_dedup

    def _messy_urls(spark, sf):
        # deterministic messy-URL fixture derived from doc_id in BOTH engines
        d = _t(spark, sf, "documents").select("doc_id")
        sid = (F.col("doc_id") % 7).cast("string")
        did = F.col("doc_id").cast("string")
        m4 = F.col("doc_id") % 4
        suffix = (
            F.when(m4 == 0, F.lit("/?utm_source=feed&b=2&a=1"))
            .when(m4 == 1, F.lit("/#frag"))
            .when(m4 == 2, F.concat(F.lit("?fbclid=x&z=9&y="), (F.col("doc_id") % 5).cast("string")))
            .otherwise(F.lit(""))
        )
        messy = F.concat(
            F.lit("HTTPS://WWW.Site"), sid, F.lit(".ORG:443/Page/"), did, suffix
        )
        return d, messy

    def url_canonicalize(spark, sf):
        # URL canonicalization (operators/urlnorm.py::canonical_url_expr):
        # case/port/fragment/tracking-param/trailing-slash rules over messy
        # URLs built deterministically from doc_id.  The oracle is a CLOSED
        # FORM (it writes the expected canonical string directly, no regex
        # re-implementation) — an independent check of the rule set.
        from aiwhispr_spark.operators.urlnorm import canonical_url_expr

        d, messy = _messy_urls(spark, sf)
        return d.select(
            "doc_id",
            messy.alias("raw_url"),
            canonical_url_expr(messy).alias("canon_url"),
        )

    q["url_canonicalize"] = url_canonicalize

    def url_latest_crawl(spark, sf):
        # Latest-crawl-per-canonical-url dedup (urlnorm.py::
        # latest_crawl_per_url): 500 docs → 50 canonical pages (doc_id%50),
        # crawl_ts=doc_id, keeper = the max — one map-side-combinable groupBy,
        # no window.  Oracle: closed-form GROUP BY page.
        from aiwhispr_spark.operators.urlnorm import latest_crawl_per_url

        d = _t(spark, sf, "documents").select("doc_id")
        messy = F.concat(
            F.lit("https://site.org/p/"),
            (F.col("doc_id") % 50).cast("string"),
            F.when(F.col("doc_id") % 2 == 0, F.lit("/")).otherwise(F.lit("")),
            F.when(F.col("doc_id") % 3 == 0, F.lit("?utm_source=x")).otherwise(F.lit("")),
        )
        df = d.select(
            "doc_id", messy.alias("url"), F.col("doc_id").cast("long").alias("crawl_ts")
        )
        out = latest_crawl_per_url(df, ts_col="crawl_ts")
        return out.select("canon_url", "doc_id", "crawl_ts")

    q["url_latest_crawl"] = url_latest_crawl

    def semantic_dedup(spark, sf):
        # SemDeDup-style semantic near-dup pairs (operators/similarity.py::
        # semantic_dedup_pairs): centroids = vec_id<8, nearest-centroid
        # assignment (lowest-cid tie-break), intra-cluster pairs at scaled
        # cosine ≥ 3500.  Oracle re-derives assignment + pairs in SQL from
        # the same doubles (identical association order ⇒ identical floats).
        from aiwhispr_spark.operators.similarity import semantic_dedup_pairs

        emb = _t(spark, sf, "embeddings")
        cents = emb.filter(F.col("vec_id") < 8)
        out = semantic_dedup_pairs(emb, cents, threshold_i=3500)
        return out.select(
            "va", "vb", F.col("cid").cast("long").alias("cid"), "cos_i"
        )

    q["semantic_dedup_pairs"] = semantic_dedup

    def unigram_lm(spark, sf):
        # Perplexity-proxy quality score (operators/textstats.py::
        # unigram_logprob_scores): corpus-self unigram LM, per-token logp
        # rounded to a scaled BIGINT before summing so the aggregate is
        # order-independent and hash-gateable.
        from aiwhispr_spark.operators.textstats import unigram_logprob_scores

        return unigram_logprob_scores(_t(spark, sf, "documents"))

    q["unigram_lm_scores"] = unigram_lm

    def link_extract(spark, sf):
        # Link extraction (operators/linkgraph.py::extract_links): href pull
        # from raw HTML, root-relative resolution against the page's own
        # scheme+host, urlnorm canonicalization, skip rules (mailto/js/
        # fragment/doc-relative).  Oracle = the CLOSED-FORM expected targets
        # from doc-index arithmetic — independent of every regex here.
        from aiwhispr_spark.operators.linkgraph import extract_links

        docs = spark.read.parquet(_ensure_link_corpus())
        return extract_links(docs)

    q["link_extract_canonical"] = link_extract

    def host_graph(spark, sf):
        # Host-level edge aggregation: page links → (src_host, dst_host,
        # n_links), intra-host edges dropped — the map-side-combinable
        # groupBy whose output (hosts, not pages) is what web-scale graph
        # analytics actually runs on.
        from aiwhispr_spark.operators.linkgraph import extract_links, host_edges

        docs = spark.read.parquet(_ensure_link_corpus())
        return host_edges(extract_links(docs))

    q["host_graph_edges"] = host_graph

    def host_pr(spark, sf):
        # PageRank over the cross-host link graph (extraction composed with
        # operators/graph.py::pagerank, 5 iterations) — host authority
        # ranking.  Oracle: the same recurrence unrolled over the closed-form
        # edge set (_pagerank_sql(edges_sql=...)).
        from aiwhispr_spark.operators.linkgraph import host_pagerank

        docs = spark.read.parquet(_ensure_link_corpus())
        return host_pagerank(docs, damping=0.85, iterations=5, num_partitions=8).select(
            "node", F.round(F.col("pr") * 1000000).cast("long").alias("pr_i")
        )

    q["host_pagerank_5"] = host_pr

    def host_trustrank_q(spark, sf):
        # TrustRank (Gyöngyi et al. 2004): personalized PageRank whose
        # teleport set is a 3-host whitelist — authority must flow out of
        # the trusted seeds (graph.py::personalized_pagerank composed with
        # the link-extraction chain).  Oracle: the same seeded recurrence
        # unrolled over the closed-form host edge set (_trustrank_sql).
        from aiwhispr_spark.operators.linkgraph import host_trustrank

        docs = spark.read.parquet(_ensure_link_corpus())
        return host_trustrank(
            docs,
            seed_hosts=_TRUST_SEED_HOSTS,
            damping=0.85,
            iterations=5,
            num_partitions=8,
        ).select("node", F.round(F.col("pr") * 1000000).cast("long").alias("tr_i"))

    q["host_trustrank_seeded"] = host_trustrank_q

    def host_spam_mass_q(spark, sf):
        # Spam-mass estimation (linkgraph.py::host_spam_mass): pr − tr per
        # host and the relative share — the Gyöngyi mass-estimation flag
        # composed from BOTH rank passes over ONE persisted host edge set.
        # Oracle: the raw-double pagerank and trustrank recurrences joined,
        # difference and quotient taken BEFORE scaling (one round each).
        from aiwhispr_spark.operators.linkgraph import host_spam_mass

        docs = spark.read.parquet(_ensure_link_corpus())
        return host_spam_mass(
            docs,
            seed_hosts=_TRUST_SEED_HOSTS,
            damping=0.85,
            iterations=5,
            num_partitions=8,
        )

    q["host_spam_mass"] = host_spam_mass_q

    def _host_graph_edges_df(spark):
        from aiwhispr_spark.operators.linkgraph import extract_links, host_edges

        docs = spark.read.parquet(_ensure_link_corpus())
        return host_edges(extract_links(docs)).select(
            F.col("src_host").alias("src"), F.col("dst_host").alias("dst")
        )

    def host_ecc_q(spark, sf):
        # Bounded out-eccentricity panel over the host graph (graph_query.py
        # ::eccentricity_profile): max min-hop distance + reach count per
        # host — diameter/radius read straight off the result.  Oracle =
        # the unrolled min-hop rounds (the harmonic-centrality pattern)
        # aggregated by SOURCE instead of destination.
        from aiwhispr_spark.operators.graph_query import eccentricity_profile

        return eccentricity_profile(_host_graph_edges_df(spark), max_hops=6)

    q["host_eccentricity"] = host_ecc_q

    def host_stress_q(spark, sf):
        # Stress centrality (graph_query.py::stress_centrality): EXACT
        # shortest-path counts through each host (σ_sv·σ_vt where distances
        # compose) — integer-exact betweenness sibling.  Oracle = the same
        # hop-synchronous σ DP unrolled (dist chain + one σ CTE per level)
        # and the same through-v join.
        from aiwhispr_spark.operators.graph_query import stress_centrality

        return stress_centrality(_host_graph_edges_df(spark), max_hops=6)

    q["host_stress_centrality"] = host_stress_q

    def host_anf_q(spark, sf):
        # HyperBall ANF (graph.py::anf_hyperball): per-host ball sizes for
        # r=1..4 via HLL sketch-union rounds — the fixed-width-state scale
        # path for neighborhood curves.  DataSketches' small-set coupon
        # mode is exact far below 2^lgk, so at gate scale round(estimate)
        # EQUALS the exact closure count (percentile-at-max-accuracy twin
        # pattern); oracle = exact ball counts off the min-hop chain.
        from aiwhispr_spark.operators.graph import anf_hyperball

        return anf_hyperball(_host_graph_edges_df(spark), radius=4, lgk=12)

    q["host_anf_hyperball"] = host_anf_q

    def host_reciprocity(spark, sf):
        # Link-exchange reciprocity per host (linkgraph.py::link_reciprocity):
        # share of out-neighbors that link back — the link-farm signal the
        # outlink-volume profile can't see.  Pure integer ratio; oracle
        # self-joins the closed-form host edge set.
        from aiwhispr_spark.operators.linkgraph import extract_links, host_edges, link_reciprocity

        docs = spark.read.parquet(_ensure_link_corpus())
        edges = host_edges(extract_links(docs)).select(
            F.col("src_host").alias("src"), F.col("dst_host").alias("dst")
        )
        return link_reciprocity(edges)

    q["host_link_reciprocity"] = host_reciprocity

    def pii_redact(spark, sf):
        # PII redaction (operators/pii.py): email/IPv4/phone masking with
        # typed tokens.  PII strings are injected into documents.text in
        # CLOSED FORM from doc_id (both engines build the same augmented
        # text), then the same ordered regex chain redacts; md5 gates the
        # full redacted text, counts gate each pattern separately.
        from aiwhispr_spark.operators.pii import pii_counts_expr, redact_pii_expr

        d = _t(spark, sf, "documents")
        aug = F.concat(
            F.col("text"),
            F.lit(" Contact user"),
            F.col("doc_id").cast("string"),
            F.lit("@example.com from 10."),
            (F.col("doc_id") % 256).cast("string"),
            F.lit(".0."),
            ((F.col("doc_id") * 7) % 256).cast("string"),
            F.lit(" or call +1-555-"),
            F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
            F.lit(" now."),
        )
        n_emails, n_ips, n_phones = pii_counts_expr(aug)
        return d.select(
            "doc_id",
            F.md5(redact_pii_expr(aug)).alias("red_md5"),
            n_emails.alias("n_emails"),
            n_ips.alias("n_ips"),
            n_phones.alias("n_phones"),
        )

    q["pii_redact"] = pii_redact

    def k_anon(spark, sf):
        # k-anonymity audit (pii.py::k_anonymity_audit): QI = (lang,
        # source) + n_chars-century ladder column, k=5, two-level local
        # generalization — under-k classes regroup without the ladder,
        # then suppress.  Sentinel −1 (never NULL) for generalized
        # ladder values.
        from aiwhispr_spark.operators.pii import k_anonymity_audit

        d = _t(spark, sf, "documents").select(
            "lang",
            "source",
            F.expr("n_chars div 100").cast("long").alias("chars_c"),
        )
        return k_anonymity_audit(d, ["lang", "source"], "chars_c", k=5).orderBy(
            "anon_level", "lang", "source", "chars_c"
        )

    q["k_anonymity_audit"] = k_anon

    def cdc_dedup(spark, sf):
        # Content-defined chunking dedup (fingerprint.py::cdc_dup_chunks):
        # gear rolling hash (pure formula, no lookup table), 16-char
        # window, mask 32 — cut placement is a closed-form windowed sum
        # both engines derive independently; the dedup exchange carries
        # (md5, id, idx) only, never chunk bytes.
        from aiwhispr_spark.operators.fingerprint import cdc_dup_chunks

        # gate domain: length <= 4000 in BOTH engines — the oracle's
        # position table is a constant range(16, 4096) (DuckDB range()
        # rejects subquery bounds), so the predicate is the shared
        # contract, not a silent one-sided cap.  The operator itself is
        # unconstrained.
        d = _t(spark, sf, "documents").filter(F.length("text") <= 4000)
        return cdc_dup_chunks(d).orderBy("chunk_md5")

    q["cdc_dedup_chunks"] = cdc_dedup

    def temp_mix(spark, sf):
        # Temperature-weighted source re-sampling (operators/mixing.py).
        # The driver corpus's sources are uniform, so a SKEWED source label
        # is derived in closed form (60/30/10) to exercise boost + cap;
        # keep-set is md5-deterministic, rates are single-scalar-pow ints.
        from aiwhispr_spark.operators.mixing import temperature_sample

        d = _t(spark, sf, "documents").select(
            "doc_id",
            F.when(F.col("doc_id") % 10 < 6, "big")
            .when(F.col("doc_id") % 10 < 9, "mid")
            .otherwise("small")
            .alias("src_grp"),
        )
        out = temperature_sample(
            d, source_col="src_grp", id_col="doc_id", alpha=0.5, base_frac=0.5
        )
        return out.select("doc_id", "src_grp", "rate_i")

    q["temperature_mix_sample"] = temp_mix

    def warc_curation(spark, sf):
        # END-TO-END web-curation composition, every stage load-bearing:
        # WARC parse (30 mirrors + 15 PII pages in the fixture) → T1 clean
        # (the reference kernel UDF) → corpus-level line dedup (the 50-doc
        # fish&chips boilerplate drops) → PII redaction (15 real hits) →
        # exact-dedup keeper election (mirror urls sort below simple*, so
        # the 30 originals lose; the 15 PII pages redact to IDENTICAL text
        # and collapse to one keeper — dedup runs downstream of redaction
        # by design, so 150+30+15 → 151 rows).  Oracle = the same five
        # stages composed in SQL from the ORIGINAL parquet + closed-form
        # extra rows.  Runs through the LIBRARY plan (plans/curation.py) so
        # the gate covers the user-facing composition, not a private twin.
        from aiwhispr_spark.plans.curation import curate_corpus
        from aiwhispr_spark.sources.warc import read_warc

        docs = read_warc(spark, _ensure_curation_warc())
        out = curate_corpus(docs, min_line_docs=3)
        return out.select(
            "doc_id",
            F.md5("text").alias("red_md5"),
            F.col("n_lines_kept").alias("n_kept"),
            F.col("n_lines_dropped").alias("n_dropped"),
        )

    q["warc_curation_pipeline"] = warc_curation

    def anchor_mining(spark, sf):
        # Anchor-text alias mining (linkgraph.py::extract_anchors +
        # anchor_aliases): visible link text per canonical target — the
        # web's free alias evidence for the KG linker.  Oracle writes each
        # expected (dst, anchor) from doc-index arithmetic; the 16-way
        # external-anchor aggregation does real counting work.
        from aiwhispr_spark.operators.linkgraph import anchor_aliases, extract_anchors

        docs = spark.read.parquet(_ensure_link_corpus())
        return anchor_aliases(extract_anchors(docs))

    q["anchor_alias_mining"] = anchor_mining

    def crawl_changes(spark, sf):
        # Re-crawl change detection (urlnorm.py::crawl_change_stats): 40
        # canonical pages × ~12 snapshots derived in closed form — a third
        # of pages churn A→B→A (parity content), a third step-change once
        # at ts 500, a third stay stable — so n_versions vs n_changes
        # separate revert churn from real versioning.  Ordering inside a
        # page is the sorted-struct array, no window.
        from aiwhispr_spark.operators.urlnorm import crawl_change_stats

        d = _t(spark, sf, "documents").select("doc_id")
        page = F.col("doc_id") % 40
        ts = (F.col("doc_id") * 37) % 1000
        ver = (
            F.when(page % 3 == 0, ts % 2)
            .when(page % 3 == 1, (ts >= 500).cast("long"))
            .otherwise(F.lit(0))
        )
        messy = F.concat(
            F.lit("https://site.org/pg/"),
            page.cast("string"),
            F.when(F.col("doc_id") % 2 == 0, F.lit("/")).otherwise(F.lit("")),
            F.when(F.col("doc_id") % 3 == 0, F.lit("?utm_source=x")).otherwise(
                F.lit("")
            ),
        )
        df = d.select(
            messy.alias("url"),
            ts.cast("long").alias("ts"),
            F.concat(F.lit("v"), ver.cast("string")).alias("content"),
        )
        return crawl_change_stats(df, ts_col="ts", content_col="content")

    q["crawl_change_stats"] = crawl_changes

    def snapshot_diff_q(spark, sf):
        # First-vs-last snapshot line diff per canonical url (urlnorm.py::
        # snapshot_line_diff): 30 pages, messy url variants, ts = doc_id
        # (unique — endpoint election unambiguous); lines exercise trim
        # (padded footer), empty-line drop, and a parity-gated extra line
        # so endpoints differ exactly when min/max doc_id parity differs.
        # Oracle rebuilds both endpoint line LISTS from arithmetic.
        from aiwhispr_spark.operators.urlnorm import snapshot_line_diff

        d = _t(spark, sf, "documents").select("doc_id")
        i = F.col("doc_id")
        page = i % 30
        messy = F.concat(
            F.lit("https://site.org/pg/"),
            page.cast("string"),
            F.when(i % 2 == 0, F.lit("/")).otherwise(F.lit("")),
            F.when(i % 3 == 0, F.lit("?utm_source=x")).otherwise(F.lit("")),
        )
        text = F.concat(
            F.lit("header "),
            page.cast("string"),
            F.lit("\n\n item "),
            (i % 7).cast("string"),
            F.lit(" \n"),
            F.when(
                i % 2 == 0,
                F.concat(F.lit("extra "), (page % 5).cast("string"), F.lit("\n")),
            ).otherwise(F.lit("")),
            F.lit("  footer  "),
        )
        df = d.select(messy.alias("url"), i.alias("ts"), text.alias("text"))
        return snapshot_line_diff(df, ts_col="ts", text_col="text")

    q["snapshot_line_diff"] = snapshot_diff_q

    def mobile_variants_q(spark, sf):
        # Mobile/AMP variant clustering (urlnorm.py::mobile_variant_clusters):
        # 50 articles × four renderings (desktop, m. host, www+/amp path,
        # ?amp=1 param) — the variant shape cycles on doc_id div 50 so every
        # article sees all four; desktop wins the canonical election.
        # Oracle = the closed-form expected cluster rows.
        from aiwhispr_spark.operators.urlnorm import mobile_variant_clusters

        d = _t(spark, sf, "documents").select("doc_id")
        p = (F.col("doc_id") % 50).cast("string")
        shape = F.expr("(doc_id div 50) % 4")
        url = (
            F.when(shape == 0, F.concat(F.lit("https://site"), p, F.lit(".org/art/"), p))
            .when(shape == 1, F.concat(F.lit("https://m.site"), p, F.lit(".org/art/"), p))
            .when(shape == 2, F.concat(F.lit("https://www.site"), p, F.lit(".org/art/"), p, F.lit("/amp")))
            .otherwise(F.concat(F.lit("https://site"), p, F.lit(".org/art/"), p, F.lit("?amp=1")))
        )
        return mobile_variant_clusters(d.select(url.alias("url")))

    q["mobile_variant_clusters"] = mobile_variants_q

    def nofollow_q(spark, sf):
        # rel-aware link extraction (linkgraph.py::extract_links_rel): four
        # anchors per closed-form page — plain, rel="nofollow", rel before
        # href with mixed-case UGC + root-relative target, and a
        # non-denial rel (noopener).  Oracle = the expected edge rows.
        from aiwhispr_spark.operators.linkgraph import extract_links_rel

        d = _t(spark, sf, "documents").select("doc_id")
        i = F.col("doc_id")
        src = F.concat(F.lit("https://s"), (i % 9).cast("string"), F.lit(".org/d/"), i.cast("string"))
        html = F.concat(
            F.lit('<html><body><p><a href="https://f'),
            (i % 5).cast("string"),
            F.lit('.org/p1">one</a> <a href="https://n'),
            (i % 4).cast("string"),
            F.lit('.org/p2" rel="nofollow">two</a> <a rel="UGC noopener" href="/local'),
            (i % 3).cast("string"),
            F.lit('">three</a> <a href="https://k.org/p4" rel="noopener">four</a></p></body></html>'),
        )
        docs = d.select(src.alias("url"), F.encode(html, "UTF-8").alias("html"))
        return extract_links_rel(docs)

    q["nofollow_link_extract"] = nofollow_q

    def domain_blocklist(spark, sf):
        # Domain-blocklist filter (urlnorm.py::filter_blocked_hosts):
        # dot-suffix semantics — blocking site3.example.org removes its
        # subdomains (ads.site3...) too; exact entries hit exactly one
        # host.  Urls + blocklist built in closed form; oracle is the
        # keep-predicate written directly on doc_id arithmetic.
        from aiwhispr_spark.operators.urlnorm import filter_blocked_hosts

        d = _t(spark, sf, "documents").select("doc_id")
        url = F.concat(
            F.lit("https://"),
            F.when(F.col("doc_id") % 4 == 0, F.lit("ads.")).otherwise(F.lit("")),
            F.lit("site"),
            (F.col("doc_id") % 7).cast("string"),
            F.lit(".example.org/p/"),
            F.col("doc_id").cast("string"),
        )
        df = d.select("doc_id", url.alias("url"))
        bl = spark.createDataFrame(
            [("site3.example.org",), ("ads.site5.example.org",)], "domain string"
        )
        return filter_blocked_hosts(df, bl).select("doc_id", "url")

    q["domain_blocklist_filter"] = domain_blocklist

    def quality_classifier(spark, sf):
        # fastText-style hashed linear keep/drop classifier
        # (textstats.py::hashed_linear_scores): token → md5 feature-hash
        # bucket → closed-form weight table → integer score sum; the whole
        # chain is one transform+aggregate expression (zero shuffle, zero
        # python).  The oracle re-derives bucket AND weight from the same
        # md5 arithmetic, so the full model dataflow is value-gated.
        from aiwhispr_spark.operators.textstats import hashed_linear_scores

        docs = _t(spark, sf, "documents").select("doc_id", "text")
        return hashed_linear_scores(docs)

    q["quality_classifier_hashed"] = quality_classifier

    def robots_filter(spark, sf):
        # Meta-robots directive compliance (operators/robots.py): noindex /
        # nofollow flags from the page html.  Six closed-form arms: both
        # attribute orders, upper/lower case, single quotes, a decoy
        # (name=description quoting "noindex" — must NOT flag), no tag, and
        # TWO robots tags whose directives must union (nofollow in the
        # first, noindex in the second — first-tag-only readers miss it).
        # The oracle is the flag table written directly from doc_id
        # arithmetic — independent of the regex implementation.
        from aiwhispr_spark.operators.robots import meta_robots_flags

        d = _t(spark, sf, "documents").select("doc_id")
        m = F.col("doc_id") % 6
        snippet = (
            F.when(m == 0, F.lit('<meta name="robots" content="noindex,nofollow">'))
            .when(m == 1, F.lit("<META NAME='robots' CONTENT='NOFOLLOW'>"))
            .when(m == 2, F.lit('<meta content="noindex" name="robots">'))
            .when(m == 3, F.lit('<meta name="description" content="noindex mention">'))
            .when(
                m == 5,
                F.lit(
                    '<meta name="robots" content="nofollow">'
                    '<meta name="robots" content="noindex">'
                ),
            )
            .otherwise(F.lit(""))
        )
        html = F.concat(
            F.lit("<html><head>"),
            snippet,
            F.lit("</head><body>Doc "),
            F.col("doc_id").cast("string"),
            F.lit("</body></html>"),
        )
        df = d.select("doc_id", html.alias("html_text"))
        return meta_robots_flags(df).select("doc_id", "noindex_i", "nofollow_i")

    q["robots_noindex_filter"] = robots_filter

    def host_hits(spark, sf):
        # HITS hubs/authorities (operators/graph.py::hits) over the linked
        # corpus's host graph — same extraction chain as host_pagerank_5,
        # same unrolled-recurrence oracle discipline (_hits_sql).  The
        # linked corpus's asymmetric host wiring separates hub scores from
        # authority scores, so both columns carry signal.
        from aiwhispr_spark.operators.graph import hits
        from aiwhispr_spark.operators.linkgraph import extract_links, host_edges

        docs = spark.read.parquet(_ensure_link_corpus())
        edges = host_edges(extract_links(docs)).select(
            F.col("src_host").alias("src"), F.col("dst_host").alias("dst")
        )
        return hits(edges, iterations=5, num_partitions=8).select(
            "node",
            F.round(F.col("hub") * 1000000).cast("long").alias("hub_i"),
            F.round(F.col("auth") * 1000000).cast("long").alias("auth_i"),
        )

    q["host_hits_5"] = host_hits

    def kcore_peel(spark, sf):
        # Undirected k-core peeling (operators/graph.py::kcore) over the
        # shared closed-form fixture (clique + pendant path + cycle +
        # isolated edge): 5 data-dependent peel rounds before the fixed
        # point; the oracle unrolls 8 (trailing rounds are no-ops).
        from aiwhispr_spark.operators.graph import kcore

        edges = spark.createDataFrame(
            _kcore_fixture_edges(), "src long, dst long"
        )
        return kcore(edges, k=2, num_partitions=8)

    q["kcore_peel"] = kcore_peel

    def web_bowtie(spark, sf):
        # Broder bowtie decomposition (graph_query.py::bowtie_structure):
        # CORE/IN/OUT/TENDRIL/DISCONNECTED relative to the largest SCC over
        # the hand-derived fixture (_bowtie_fixture_edges — includes a
        # smaller competing SCC, tendrils both ways, and a disconnected
        # SCC).  Oracle = the closed-form expected classes.
        from aiwhispr_spark.operators.graph_query import bowtie_structure

        edges = spark.createDataFrame(
            _bowtie_fixture_edges(), "src string, dst string"
        )
        return bowtie_structure(edges, max_hops=6)

    q["web_bowtie_structure"] = web_bowtie

    def kg_condensation_q(spark, sf):
        # Condensation DAG (graph_query.py::condensation_dag): SCCs of the
        # bowtie fixture contracted, longest-path topological level per
        # component (i1 → i0 → c0-cycle → o0 → o1 gives depth 4; the
        # disconnected d0↔d1 component sits at level 0).  Oracle = the
        # hand-derived closed-form component rows.
        from aiwhispr_spark.operators.graph_query import condensation_dag

        edges = spark.createDataFrame(
            _bowtie_fixture_edges(), "src string, dst string"
        )
        return condensation_dag(edges, max_hops=6)

    q["kg_condensation"] = kg_condensation_q

    def bloom_dedup(spark, sf):
        # Bloom-filter membership prefilter (operators/bloomfilter.py): the
        # runtime-filter pattern for delta-vs-store dedup.  Delta = every
        # 10th doc's digest; per store doc the query emits whether the
        # m=4096/k=3 filter admits it AND whether it is a true member —
        # the oracle recomputes the same md5-derived bit set, so any false
        # positive the geometry produces must match exactly too.
        from aiwhispr_spark.operators.bloomfilter import (
            bloom_probe_expr,
            build_bloom_positions,
        )

        docs = _t(spark, sf, "documents").select("doc_id", "text")
        store = docs.select("doc_id", F.md5("text").alias("dg"))
        delta = docs.where(F.col("doc_id") % 10 == 0).select(
            F.md5("text").alias("dg")
        )
        positions = build_bloom_positions(delta, "dg")
        probed = store.withColumn(
            "bloom_pass_i",
            bloom_probe_expr(F.col("dg"), positions).cast("long"),
        )
        membership = delta.distinct().withColumn("_t", F.lit(1))
        return probed.join(membership, "dg", "left").select(
            "doc_id",
            "bloom_pass_i",
            F.coalesce("_t", F.lit(0)).cast("long").alias("true_dup_i"),
        )

    q["bloom_prefilter_dedup"] = bloom_dedup

    def dup_ngram_spans(spark, sf):
        # Corpus-self duplicate n-gram spans (decontam.py::
        # duplicate_ngram_spans, the exact-substring-dedup signal): a shared
        # 9-token sentence is appended to every third doc in closed form, so
        # those docs carry ≥5 corpus-duplicated 5-gram windows (plus any
        # organic overlap, which the oracle reproduces from the same text).
        from aiwhispr_spark.operators.decontam import duplicate_ngram_spans

        docs = _t(spark, sf, "documents").select(
            "doc_id",
            F.concat(
                F.col("text"),
                F.when(
                    F.col("doc_id") % 3 == 0, F.lit(_DUP_SPAN_SENTENCE)
                ).otherwise(F.lit("")),
            ).alias("text"),
        )
        return duplicate_ngram_spans(docs, n=5).withColumnRenamed("id", "doc_id")

    q["duplicate_ngram_spans"] = dup_ngram_spans

    def span_removal(spark, sf):
        # APPLY exact-substring dedup (decontam.py::remove_duplicate_spans):
        # same planted corpus as duplicate_ngram_spans, but the duplicated
        # windows are CUT and the survivors re-joined — byte-exact cleaned
        # text gated against an independent NOT-EXISTS range cut in DuckDB.
        from aiwhispr_spark.operators.decontam import remove_duplicate_spans

        docs = _t(spark, sf, "documents").select(
            "doc_id",
            F.concat(
                F.col("text"),
                F.when(
                    F.col("doc_id") % 3 == 0, F.lit(_DUP_SPAN_SENTENCE)
                ).otherwise(F.lit("")),
            ).alias("text"),
        )
        return remove_duplicate_spans(docs, n=5).withColumnRenamed("id", "doc_id")

    q["dedup_span_removal"] = span_removal

    def bpe_pairs(spark, sf):
        # First BPE merge iteration over the corpus (textstats.py::
        # bpe_pair_counts): vocabulary-weighted adjacent character pairs,
        # deterministic top-20 (count DESC, pair ASC).
        from aiwhispr_spark.operators.textstats import bpe_pair_counts

        docs = _t(spark, sf, "documents").select("text")
        return bpe_pair_counts(docs, top_k=20)

    q["bpe_pair_stats"] = bpe_pairs

    def paragraph_dedup(spark, sf):
        # Dolma-style PARAGRAPH-level corpus dedup — linededup generalized
        # to sep="\n\n" (the paragraph unit).  Every even doc leads with the
        # same cookie-notice paragraph (closed form), so it drops; the
        # per-doc body paragraph survives.  Oracle is the closed-form
        # expected output (independent of the split/count/reassemble
        # implementation).
        from aiwhispr_spark.operators.linededup import drop_boilerplate_lines

        d = _t(spark, sf, "documents").select("doc_id")
        shared = "Cookie notice please accept our cookies to continue"
        body = F.concat(
            F.lit("Body paragraph number "),
            F.col("doc_id").cast("string"),
            F.lit(" with distinct content"),
        )
        text = F.concat(
            F.when(F.col("doc_id") % 2 == 0, F.lit(shared + "\n\n")).otherwise(
                F.lit("")
            ),
            body,
        )
        docs = d.select("doc_id", text.alias("text"))
        out = drop_boilerplate_lines(docs, min_docs=2, sep="\n\n")
        return out.select(
            "doc_id", F.md5("text_clean").alias("clean_md5"), "n_kept", "n_dropped"
        )

    q["paragraph_dedup"] = paragraph_dedup

    def transe_score(spark, sf):
        # TransE triple plausibility (operators/kgscore.py): closed-form
        # candidate triples from doc_id arithmetic, energy = Σ|s + r − o|
        # over 16 integer-thousandth components — exact BIGINT math, so the
        # oracle re-derives every component from the same md5 arithmetic.
        from aiwhispr_spark.operators.kgscore import transe_scores

        d = _t(spark, sf, "documents").select("doc_id")
        triples = d.select(
            F.concat(F.lit("Entity_"), (F.col("doc_id") % 40).cast("string")).alias(
                "subj"
            ),
            F.element_at(
                F.array(F.lit("founded"), F.lit("acquired"), F.lit("based_in")),
                (F.col("doc_id") % 3 + 1).cast("int"),
            ).alias("pred"),
            F.concat(
                F.lit("Entity_"), ((F.col("doc_id") * 7 + 1) % 40).cast("string")
            ).alias("obj"),
        ).distinct()
        return transe_scores(triples, dim=16)

    q["kg_transe_score"] = transe_score

    def distmult_score(spark, sf):
        # DistMult bilinear-diagonal scoring (kgscore.py::distmult_scores)
        # over the same closed-form triple base as kg_transe_score — the
        # multiplicative twin; symmetry pinned in tests.
        from aiwhispr_spark.operators.kgscore import distmult_scores

        d = _t(spark, sf, "documents")
        triples = d.select(
            F.concat(F.lit("Entity_"), (F.col("doc_id") % 40).cast("string")).alias(
                "subj"
            ),
            F.element_at(
                F.array(F.lit("founded"), F.lit("acquired"), F.lit("based_in")),
                (F.col("doc_id") % 3 + 1).cast("int"),
            ).alias("pred"),
            F.concat(
                F.lit("Entity_"), ((F.col("doc_id") * 7 + 1) % 40).cast("string")
            ).alias("obj"),
        ).distinct()
        return distmult_scores(triples, dim=16)

    q["kg_distmult_score"] = distmult_score

    _SOUNDEX_NAMES = [
        "Smith", "Smyth", "Smythe", "Schmidt", "Schmitt", "Johnson",
        "Jonson", "Johnston", "Ashcraft", "Ashcroft", "Tymczak",
        "Pfister", "Honeyman", "Lee", "Leigh", "Lea", "VanDeusen",
        "Washington", "Gutierrez", "Robert", "Rupert", "Rubin",
        "Jackson", "Jaxon", "Meyer", "Maier", "Mayr", "Miller",
        "Mueller", "OBrien", "O'Brien", "Wu", "Woo",
    ]

    def phonetic(spark, sf):
        # Soundex phonetic blocking (namesim.py::soundex_expr/
        # phonetic_blocks): NARA spec with TRANSPARENT H/W (Ashcraft →
        # A261 — where simplified variants diverge), RE2-safe per-digit
        # run collapse so the oracle runs the LITERAL same chain; classic
        # surname-variant list; blocks ≥ 2 names.
        from aiwhispr_spark.operators.namesim import phonetic_blocks

        names = spark.createDataFrame(
            [(n,) for n in _SOUNDEX_NAMES], "name string"
        )
        return phonetic_blocks(names).orderBy("soundex")

    q["soundex_blocking"] = phonetic

    def geohash(spark, sf):
        # integer geohash encoding (geo.py::geohash_cells): all-BIGINT
        # quantization reproducing the classic binary subdivision
        # (canonical vector pinned); prefix = spatial partition key.
        from aiwhispr_spark.operators.geo import geohash_cells

        d = _t(spark, sf, "documents").select(
            "doc_id",
            ((F.col("doc_id") * 7919) % 1800000001 - 900000000)
            .cast("long")
            .alias("lat_e7"),
            ((F.col("doc_id") * 104729) % 3600000001 - 1800000000)
            .cast("long")
            .alias("lng_e7"),
        )
        out = geohash_cells(d, precision=7)
        return out.select(
            "doc_id", "lat_e7", "lng_e7", "geohash",
            F.substring("geohash", 1, 4).alias("cell4"),
        ).orderBy("doc_id")

    q["geohash_encode"] = geohash

    def pdfclean(spark, sf):
        # PDF/OCR text cleanup (unicodenorm.py::pdf_text_cleanup):
        # ligature expansion (the subset NFKC would fix without NFKC's
        # collateral), lowercase-both-sides dehyphenation, whitespace
        # collapse — with per-stage counts so each stage gates
        # separately.
        from aiwhispr_spark.operators.unicodenorm import pdf_text_cleanup

        d = _t(spark, sf, "documents").select("doc_id")
        reps = (F.col("doc_id") % 3 + 1).cast("int")
        unit = F.lit("eﬃcient ﬂow compu-\ntation num-\nber ")
        text = F.concat(
            F.array_join(
                F.transform(F.sequence(F.lit(1), reps), lambda _: unit), ""
            ),
            F.lit("the ﬁnal line"),
        )
        return pdf_text_cleanup(d.select("doc_id", text.alias("text"))).orderBy(
            "id"
        )

    q["pdf_text_cleanup"] = pdfclean

    def topk_merge(spark, sf):
        # incremental top-k maintenance (topk.py::topk_incremental_merge):
        # top-20 priciest lineitems from TWO batch-local top-20s merged —
        # provably ≡ the global top-20 for row-level scores; the oracle IS
        # the direct global query, so the gate pins the equivalence.
        from aiwhispr_spark.operators.topk import topk_incremental_merge

        li = _t(spark, sf, "lineitem").select(
            "l_orderkey",
            "l_linenumber",
            F.round(F.col("l_extendedprice") * 100).cast("long").alias("price_ci"),
        )
        order = [
            F.col("price_ci").desc(),
            F.col("l_orderkey"),
            F.col("l_linenumber"),
        ]
        b1 = li.filter(F.col("l_orderkey") % 2 == 0)
        b2 = li.filter(F.col("l_orderkey") % 2 == 1)
        return topk_incremental_merge([b1, b2], 20, order)

    q["topk_incremental_merge"] = topk_merge

    def enc_stats(spark, sf):
        # columnar encoding planner (layout.py::column_encoding_stats):
        # exact integer plain/dict/RLE byte estimates under the writer's
        # sort order, runs scoped to parquet-style row groups; the sort
        # key is UNIQUE (orderkey·8 + linenumber) so the window order is
        # total in both engines.
        from aiwhispr_spark.operators.layout import column_encoding_stats

        li = _t(spark, sf, "lineitem").withColumn(
            "sk", F.expr("l_orderkey * 8 + l_linenumber")
        )
        return column_encoding_stats(
            li,
            ["l_returnflag", "l_linestatus", "l_quantity"],
            "sk",
        ).orderBy("column")

    q["column_encoding_stats"] = enc_stats

    def transe_eval_q(spark, sf):
        # Filtered link-prediction eval (kgscore.py::transe_eval): rank each
        # positive against its 8 filtered corrupted-object negatives, exact
        # integer reciprocal-rank sums + Hits@1/3 per predicate.  Same
        # closed-form triple base as kg_transe_score, so the oracle composes
        # the negative-sampling SQL with the energy arithmetic end-to-end.
        from aiwhispr_spark.operators.kgscore import transe_eval

        d = _t(spark, sf, "documents").select("doc_id")
        triples = d.select(
            F.concat(F.lit("Entity_"), (F.col("doc_id") % 40).cast("string")).alias(
                "subj"
            ),
            F.element_at(
                F.array(F.lit("founded"), F.lit("acquired"), F.lit("based_in")),
                (F.col("doc_id") % 3 + 1).cast("int"),
            ).alias("pred"),
            F.concat(
                F.lit("Entity_"), ((F.col("doc_id") * 7 + 1) % 40).cast("string")
            ).alias("obj"),
        )
        return transe_eval(triples, per_triple=8, dim=16)

    q["kg_transe_eval"] = transe_eval_q

    def host_walks(spark, sf):
        # Deterministic random walks (graph.py::deterministic_walks): the
        # DeepWalk corpus generator over the linked-corpus host graph, md5-
        # derandomized step choice, walk length 4, one walk per node.
        from aiwhispr_spark.operators.graph import deterministic_walks
        from aiwhispr_spark.operators.linkgraph import extract_links, host_edges

        docs = spark.read.parquet(_ensure_link_corpus())
        edges = host_edges(extract_links(docs)).select(
            F.col("src_host").alias("src"), F.col("dst_host").alias("dst")
        )
        return deterministic_walks(edges, length=4, num_partitions=8)

    q["host_random_walks"] = host_walks

    def crawl_priority(spark, sf):
        # Re-crawl scheduling composition (urlnorm.py::crawl_schedule_
        # priority): authority × churn.  Host PageRank comes from the REAL
        # extraction chain over the linked corpus; per-page churn from three
        # closed-form snapshots (every 4th page changes content each crawl,
        # the rest are stable), so priority_i = pr_i · (n_changes + 1)
        # separates hot-host-churning pages from everything else.
        from aiwhispr_spark.operators.graph import pagerank
        from aiwhispr_spark.operators.linkgraph import extract_links, host_edges
        from aiwhispr_spark.operators.urlnorm import (
            crawl_change_stats,
            crawl_schedule_priority,
        )

        docs = spark.read.parquet(_ensure_link_corpus())
        base = docs.select(
            "url",
            F.regexp_extract("url", r"a/(\d+)$", 1).cast("long").alias("i"),
        )
        ts = spark.createDataFrame([(100,), (200,), (300,)], "ts long")
        snaps = base.crossJoin(ts).select(
            "url",
            "ts",
            F.when(
                F.col("i") % 4 == 0,
                F.concat(F.col("url"), F.lit("#"), F.col("ts").cast("string")),
            )
            .otherwise(F.col("url"))
            .alias("content"),
        )
        ch = crawl_change_stats(
            snaps, url_col="url", ts_col="ts", content_col="content"
        )
        edges = host_edges(extract_links(docs)).select(
            F.col("src_host").alias("src"), F.col("dst_host").alias("dst")
        )
        pr = pagerank(edges, damping=0.85, iterations=5, num_partitions=8).select(
            "node", F.round(F.col("pr") * 1000000).cast("long").alias("pr_i")
        )
        return crawl_schedule_priority(ch, pr, top_k=30)

    q["crawl_schedule_priority"] = crawl_priority

    def jsonl_roundtrip(spark, sf):
        # JSONL source (sources/jsonl.py): explicit-schema PERMISSIVE read —
        # unicode, embedded quotes/newlines, one malformed line that must
        # land in _corrupt_record (and be skipped here), never kill the job.
        from aiwhispr_spark.sources.jsonl import read_jsonl

        df = read_jsonl(spark, _ensure_jsonl_corpus())
        good = df.where(
            F.col("_corrupt_record").isNull() & F.col("doc_id").isNotNull()
        )
        return good.select(
            "doc_id",
            "lang",
            F.length("text").cast("long").alias("n_chars"),
            F.md5("text").alias("text_md5"),
        )

    q["jsonl_roundtrip"] = jsonl_roundtrip

    def nfc_normalize_q(spark, sf):
        # Unicode NFC normalization (operators/unicodenorm.py): pandas-UDF
        # unicodedata.normalize vs DuckDB's utf8proc nfc_normalize — the two
        # independent UAX#15 implementations must agree byte-for-byte on the
        # mixed-form fixture (decomposed accents, Hangul jamo, compatibility
        # chars, plain ascii).
        from aiwhispr_spark.operators.unicodenorm import normalize_text

        docs = spark.read.parquet(_ensure_unicode_corpus())
        out = normalize_text(docs, text_col="text", form="NFC", out_col="text_nfc")
        return out.select(
            "doc_id",
            F.md5("text_nfc").alias("nfc_md5"),
            F.col("changed_i").cast("int").alias("changed_i"),
            F.length("text_nfc").cast("long").alias("n_chars_nfc"),
        )

    q["unicode_nfc_normalize"] = nfc_normalize_q

    def robots_txt_q(spark, sf):
        # robots.txt rule engine (operators/robots.py, RFC 9309 subset):
        # group parsing (consecutive-UA merge, orphan-rule drop, comments),
        # most-specific-agent-only selection, longest-prefix match with
        # allow-wins ties.  Oracle re-derives the whole spec independently
        # in DuckDB SQL (windows over line numbers, not closed-form).
        import os

        from aiwhispr_spark.operators.robots import (
            apply_robots_rules,
            parse_robots_rules,
        )

        d = _ensure_robots_corpus()
        robots = spark.read.parquet(os.path.join(d, "robots.parquet"))
        urls = spark.read.parquet(os.path.join(d, "urls.parquet"))
        rules = parse_robots_rules(robots)
        return apply_robots_rules(urls, rules, agent="AIWhisprBot").select(
            "url",
            F.col("allowed_i").cast("int").alias("allowed_i"),
            "match_prefix",
        )

    q["robots_txt_fetch_policy"] = robots_txt_q

    def sitemap_frontier_q(spark, sf):
        # Sitemap discovery (sources/sitemap.py): <url> blocks via ONE JVM
        # regexp_extract_all, loc/lastmod per block, frontier diff against
        # crawl state (new/stale/fresh/unknown) — ISO dates stay strings.
        import os

        from aiwhispr_spark.sources.sitemap import (
            parse_sitemap_entries,
            sitemap_frontier,
        )

        d = _ensure_sitemap_corpus()
        sitemaps = spark.read.parquet(os.path.join(d, "sitemaps.parquet"))
        state = spark.read.parquet(os.path.join(d, "crawlstate.parquet"))
        return sitemap_frontier(parse_sitemap_entries(sitemaps), state)

    q["sitemap_frontier_diff"] = sitemap_frontier_q

    def dsir_weights(spark, sf):
        # DSIR data selection (textstats.dsir_importance_weights): hashed-
        # unigram importance weights of every raw doc against a target
        # subset (doc_id%5==0 stands in for the curated corpus).  The
        # per-bucket log-ratio chain is a FIXED left-associated double
        # sequence, int-rounded before the per-doc sum.
        from aiwhispr_spark.operators.textstats import dsir_importance_weights

        docs = _t(spark, sf, "documents")
        target = docs.where(F.col("doc_id") % 5 == 0)
        return dsir_importance_weights(docs, target)

    q["dsir_importance_weights"] = dsir_weights

    def cdx_fetch(spark, sf):
        # CDX index source (sources/cdx.py): line split + explicit-schema
        # from_json, 200/html filter, one capture per content digest
        # (earliest ts), byte-range fetch list; surt_match_i cross-checks
        # the engine's SURT builder against the line's key (oracle builds
        # its own SURT in SQL — two independent impls of the same rule).
        from aiwhispr_spark.sources.cdx import fetch_list, read_cdx, surt_key_expr

        cdx = read_cdx(spark, _ensure_cdx_fixture())
        out = fetch_list(cdx)
        return out.select(
            "digest",
            "ts",
            "surt",
            "url",
            "filename",
            "offset_l",
            "length_l",
            (F.col("surt") == surt_key_expr(F.col("url")))
            .cast("int")
            .alias("surt_match_i"),
        )

    q["cdx_fetch_list"] = cdx_fetch

    def minhash_incremental(spark, sf):
        # Incremental MinHash (dedup.incremental_minhash_pairs): batch 1
        # (originals) is indexed into (band_store, sig_store); batch 2 (the
        # perturbed copies) arrives as the delta and must find its near-dups
        # WITHOUT re-shingling batch 1 — verification is signature
        # agreement (n_match of 16 md5 minhashes), so the index alone
        # suffices.  Oracle recomputes full-corpus banding and filters to
        # delta-involving pairs (b >= 10000 ⟺ involves batch 2).
        from aiwhispr_spark.operators.dedup import (
            incremental_minhash_pairs,
            minhash_index,
        )

        d0 = (
            _t(spark, sf, "documents")
            .filter(F.col("doc_id") < 300)
            .select("doc_id", "text")
        )
        aug = d0.select(
            (F.col("doc_id") + 10000).alias("doc_id"),
            F.concat("text", F.lit(MINHASH_TAIL)).alias("text"),
        )
        bands1, sigs1 = minhash_index(d0, "text", "doc_id", hash_family="md5")
        pairs, _, _ = incremental_minhash_pairs(
            aug, bands1, sigs1, "text", "doc_id", hash_family="md5", min_matches=8
        )
        return pairs.select("a", "b", F.col("n_match_i").cast("int").alias("n_match_i"))

    q["minhash_incremental_delta"] = minhash_incremental

    def wav_features_q(spark, sf):
        # REAL WAV (RIFF/PCM-16) decode (multimodal.wav_audio_features):
        # numpy-only chunk walker, exact-integer stats (sum of squares,
        # strict sign-change crossings).  The fixture is square waves, so
        # the oracle states every output CLOSED-FORM from the clip index —
        # fully independent of the decoder.  The corrupt record surfaces as
        # NULL stats (pinned in tests/test_wav_audio.py); the hash gate
        # filters it because NULL ints render None-vs-NaN across engines.
        from aiwhispr_spark.operators.multimodal import wav_audio_features

        clips = spark.read.parquet(_ensure_wav_corpus())
        return wav_audio_features(clips).where(
            F.col("sample_rate_i").isNotNull()
        )

    q["wav_audio_features"] = wav_features_q

    def charset_decode_q(spark, sf):
        # Charset sniff + decode (operators/charset.py): BOM / meta-charset
        # detection is pure JVM; python codecs transcode cp1252/utf-16
        # payloads in one mapInPandas.  Oracle rebuilds every decoded string
        # CLOSED-FORM from the doc index (accents via chr() on both sides)
        # — byte drift anywhere in detect/strip/decode breaks the md5.
        from aiwhispr_spark.operators.charset import decode_payloads

        docs = spark.read.parquet(_ensure_charset_corpus())
        out = decode_payloads(docs)
        return out.select(
            "doc_id",
            "charset",
            "bom_i",
            F.md5("text").alias("text_md5"),
            F.length("text").cast("long").alias("n_chars"),
        )

    q["charset_detect_decode"] = charset_decode_q

    def hll_distinct_gate(spark, sf):
        # HLL++ sketch gate (the ivf_all_probe_equals_exact /
        # chars_percentiles_approx pattern): per-language approx distinct
        # token count vs the exact count, value-gated on the sketch staying
        # inside its configured rsd.  The oracle can't reproduce Spark's
        # HLL estimate, so the gated columns are the EXACT count plus
        # within_tol_i — if the sketch ever drifts past 3×rsd=6%, Spark
        # emits 0 where the oracle says 1 and the hash gate fails.  At
        # 100 TB the sketch is the only viable plan: fixed ~1.5 KB state
        # per group vs an exact distinct's token-cardinality shuffle.
        docs = _t(spark, sf, "documents")
        toks = docs.select(
            "lang",
            F.explode(F.split(F.lower("text"), r"\s+")).alias("tok"),
        ).filter(F.col("tok") != "")
        per_lang = toks.groupBy("lang").agg(
            F.countDistinct("tok").alias("exact_l"),
            F.approx_count_distinct("tok", 0.02).alias("approx_l"),
        )
        return per_lang.select(
            "lang",
            F.col("exact_l").cast("long").alias("exact_distinct_l"),
            (
                F.abs(F.col("approx_l") - F.col("exact_l"))
                <= F.col("exact_l") * 0.06
            )
            .cast("int")
            .alias("within_tol_i"),
        )

    q["hll_distinct_tokens"] = hll_distinct_gate

    def compression_signal(spark, sf):
        # zlib compressibility signal (textstats.compression_ratios):
        # genuinely python (no zlib in any SQL engine → no DuckDB twin, so
        # this registers rows-only BY DESIGN); the value gate is the pytest
        # golden against the zlib reference in tests/test_robots_quality.py.
        from aiwhispr_spark.operators.textstats import compression_ratios

        docs = _t(spark, sf, "documents").select("doc_id", "text")
        return compression_ratios(docs)

    q["compression_ratio_signal"] = compression_signal

    def main_content(spark, sf):
        # Link-density main-content extraction (operators/maincontent.py):
        # integer cross-multiplied density decision per closed BLOCK
        # (newlines normalized first, so multi-line anchors can't hide),
        # chrome dropped before any tag strip.  The fixture's blocks
        # straddle the 50% threshold (nav ~75%, "local page" ~54%,
        # "external" ~44%), so the gate pins the exact decision boundary.
        from aiwhispr_spark.operators.maincontent import (
            block_link_density,
            keep_block,
            main_content_expr,
        )

        docs = spark.read.parquet(_ensure_link_corpus())
        text = F.decode("html", "UTF-8")
        dens = block_link_density(text)
        return docs.select(
            "url",
            F.md5(main_content_expr(text, max_link_pct=50)).alias("main_md5"),
            F.size(F.filter(dens, lambda s: keep_block(s, 50)))
            .cast("long")
            .alias("kept_blocks"),
            F.size(dens).cast("long").alias("total_blocks"),
        )

    q["main_content_extract"] = main_content

    def dedup_incremental(spark, sf):
        # O(delta) dedup: fold the corpus through two ingest batches against
        # a digest store (operators/dedup.py::incremental_exact_dedup); the
        # result must equal a full-corpus min-id dedup (the oracle) because
        # batch order follows id order — the exact-dedup twin of manifest
        # resume
        from aiwhispr_spark.operators.dedup import incremental_exact_dedup

        d = _t(spark, sf, "documents")
        b1, b2 = d.filter(F.col("doc_id") < 250), d.filter(F.col("doc_id") >= 250)
        k1, store = incremental_exact_dedup(b1, None)
        k2, _ = incremental_exact_dedup(b2, store)
        return k1.select("doc_id").unionByName(k2.select("doc_id"))

    q["dedup_incremental_two_batch"] = dedup_incremental

    def quantize_int8(spark, sf):
        # int8 symmetric quantization of the embedding store (4× memory cut
        # — the first rung of vector compression at 10^12 embeddings),
        # value-gated per component: scale + every quantized dim must match
        # the oracle's same double math exactly
        from aiwhispr_spark.operators.similarity import quantize_embeddings_int8

        emb = _t(spark, sf, "embeddings").filter(F.col("vec_id") < 200)
        qd = quantize_embeddings_int8(emb)
        return qd.select(
            "vec_id",
            F.round((F.col("scale")) * 10000000).cast("long").alias("scale_i"),
            F.posexplode("qvec").alias("dim", "q"),
        ).select("vec_id", "scale_i", "dim", F.col("q").cast("int").alias("q"))

    q["embedding_quantize_int8"] = quantize_int8

    # ---- dedup / similarity (training-data ops) ----
    def dedup_exact(spark, sf):
        d = _t(spark, sf, "documents")
        w = Window.partitionBy(F.md5("text"))
        return d.select(
            "doc_id",
            F.min("doc_id").over(w).alias("keep_id"),
            F.count(F.lit(1)).over(w).alias("group_size"),
        )

    q["dedup_exact"] = dedup_exact

    def ngram_jaccard(spark, sf):
        d = (
            _t(spark, sf, "documents")
            .filter(F.col("doc_id") < 200)
            .select(
                F.col("doc_id").alias("id"),
                F.array_distinct(F.split(F.trim("text"), r"\s+")).alias("toks"),
            )
        )
        pairs = (
            d.alias("l")
            .join(d.alias("r"), F.col("l.id") < F.col("r.id"))
            .select(
                F.col("l.id").alias("a"),
                F.col("r.id").alias("b"),
                _scaled(
                    F.size(F.array_intersect("l.toks", "r.toks"))
                    / F.size(F.array_union("l.toks", "r.toks"))
                ).alias("jaccard_i"),
            )
        )
        return pairs.filter(F.col("jaccard_i") >= 5000)

    q["ngram_jaccard_pairs"] = ngram_jaccard

    def containment_syndication(spark, sf):
        # Asymmetric shingle containment (dedup.py::containment_pairs):
        # syndicated-copy detection — C(a→b) = |S_a∩S_b|/|S_a| catches a
        # small doc wrapped in a larger boilerplate page where Jaccard
        # can't.  Copies are built in CLOSED FORM (every doc_id%4==0 doc
        # reappears wrapped at id+10000) so the oracle constructs the same
        # augmented corpus and recomputes containment from trigram lists.
        from aiwhispr_spark.operators.dedup import containment_pairs

        d0 = (
            _t(spark, sf, "documents")
            .filter(F.col("doc_id") < 300)
            .select("doc_id", "text")
        )
        synd = d0.filter(F.col("doc_id") % 4 == 0).select(
            (F.col("doc_id") + 10000).alias("doc_id"),
            F.concat(
                F.lit("Syndicated digest follows . "),
                F.col("text"),
                F.lit(" . All rights reserved ."),
            ).alias("text"),
        )
        corpus = d0.unionByName(synd)
        return containment_pairs(corpus, n=3, threshold=0.9)

    q["containment_syndication_pairs"] = containment_syndication

    def fellegi_sunter(spark, sf):
        # Probabilistic record linkage (linking.py::fellegi_sunter_scores):
        # 240 records built closed-form from doc_id — 60 entities × 4
        # formatting variants (' Inc' suffix, lowercase, city typo, year
        # off-by-one); candidates block on e%12; m/u estimated from the
        # gold key (the clerical-sample plug point); successive-integer-
        # division likelihood ratio in fixed field order.  Oracle rebuilds
        # records, pairs, counts, and the same division chain in SQL.
        from aiwhispr_spark.operators.linking import fellegi_sunter_scores

        d = _t(spark, sf, "documents").filter(F.col("doc_id") < 240)
        e = F.col("doc_id") % 60
        v = (F.col("doc_id") / 60).cast("long")
        rec = d.select(
            F.col("doc_id").alias("rid"),
            e.alias("ekey"),
            (e % 12).alias("block"),
            F.when(v == 1, F.concat(F.lit("Entity "), e.cast("string"), F.lit(" Inc")))
            .when(v == 2, F.concat(F.lit("entity "), e.cast("string")))
            .otherwise(F.concat(F.lit("Entity "), e.cast("string")))
            .alias("name"),
            F.concat(
                F.lit("City "),
                F.when(v == 2, (e + 1) % 7).otherwise(e % 7).cast("string"),
            ).alias("city"),
            (
                F.lit(1980) + e % 30 + F.when(v == 1, 1).otherwise(0)
            ).cast("long").alias("year"),
        )
        l, r = rec.alias("l"), rec.alias("r")
        pairs = l.join(
            r,
            (F.col("l.block") == F.col("r.block"))
            & (F.col("l.rid") < F.col("r.rid")),
        ).select(
            F.col("l.rid").alias("rid_a"),
            F.col("r.rid").alias("rid_b"),
            (F.col("l.name") == F.col("r.name")).alias("agr_name"),
            (F.col("l.city") == F.col("r.city")).alias("agr_city"),
            (F.col("l.year") == F.col("r.year")).alias("agr_year"),
            (F.col("l.ekey") == F.col("r.ekey")).alias("is_match"),
        )
        out = fellegi_sunter_scores(
            pairs, ["agr_name", "agr_city", "agr_year"], "is_match"
        )
        return out.select(
            "rid_a",
            "rid_b",
            "pattern",
            "lr_i",
            F.when(F.col("is_match"), 1).otherwise(0).cast("int").alias("gold_i"),
        )

    q["fellegi_sunter_linkage"] = fellegi_sunter

    def snm_q(spark, sf):
        # Sorted-neighborhood blocking (linking.py::snm_candidate_pairs):
        # window 3 over the (key, id) total order via the scale-safe global
        # rank — the typo-adjacency complement to LSH banding.  Key spreads
        # ids across 100 sort positions so neighborhoods cross position
        # boundaries; oracle = row_number + rank-distance self-join.
        from aiwhispr_spark.operators.linking import snm_candidate_pairs

        d = _t(spark, sf, "documents").select("doc_id")
        recs = d.select(
            F.col("doc_id").alias("id"),
            F.concat(
                F.lit("k"),
                F.lpad(((F.col("doc_id") * 7) % 100).cast("string"), 2, "0"),
            ).alias("key"),
        )
        return snm_candidate_pairs(recs, key_col="key", id_col="id", window=3)

    q["snm_candidate_pairs"] = snm_q

    def blocking_eval(spark, sf):
        # Blocking-scheme fitness panel (evaluation.py::blocking_quality):
        # the md5 minhash banding's RAW candidate set (threshold 0 — no
        # verify filter) scored against gold = exact all-pairs trigram
        # Jaccard ≥ 0.5 on the same augmented corpus: pairs completeness /
        # pairs quality / reduction ratio as one exact-integer row.  The
        # go/no-go check an LSH config gets before a corpus-scale dedup.
        from aiwhispr_spark.operators.dedup import _token_ngrams, minhash_lsh_pairs_md5
        from aiwhispr_spark.operators.evaluation import blocking_quality

        d0 = (
            _t(spark, sf, "documents")
            .filter(F.col("doc_id") < 150)
            .select("doc_id", "text")
        )
        aug = d0.select(
            (F.col("doc_id") + 10000).alias("doc_id"),
            F.concat("text", F.lit(MINHASH_TAIL)).alias("text"),
        )
        corpus = d0.unionByName(aug)
        cand = minhash_lsh_pairs_md5(corpus, jaccard_threshold=0.0).select("a", "b")
        base = corpus.select(
            F.col("doc_id").alias("id"), _token_ngrams(F.col("text"), 3).alias("sh")
        ).filter(F.size("sh") > 0)
        l, r = base.alias("l"), base.alias("r")
        gold = (
            l.join(r, F.col("l.id") < F.col("r.id"))
            .select(
                F.col("l.id").alias("a"),
                F.col("r.id").alias("b"),
                (
                    F.size(F.array_intersect("l.sh", "r.sh"))
                    / F.size(F.array_union("l.sh", "r.sh"))
                ).alias("j"),
            )
            .filter(F.col("j") >= 0.5)
            .select("a", "b")
        )
        return blocking_quality(cand, gold, base)

    q["minhash_blocking_eval"] = blocking_eval

    def embedding_near_dup(spark, sf):
        # per-vector norms are computed ONCE before the pair join (not twice
        # per pair): O(n) norm work instead of O(n²), ~3× less expression
        # evaluation in the O(n²) stage.  Same IEEE values → same scaled ints.
        vd = F.col("embedding").cast("array<double>")
        e = (
            _t(spark, sf, "embeddings")
            .filter(F.col("vec_id") < 300)
            .select(
                F.col("vec_id").alias("id"),
                vd.alias("v"),
                F.sqrt(
                    F.aggregate(vd, F.lit(0.0), lambda acc, x: acc + x * x)
                ).alias("nv"),
            )
        )
        dot = F.aggregate(
            F.zip_with(F.col("l.v"), F.col("r.v"), lambda x, y: x * y),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        cos = F.when(
            (F.col("l.nv") > 0) & (F.col("r.nv") > 0), dot / (F.col("l.nv") * F.col("r.nv"))
        ).otherwise(F.lit(0.0))
        pairs = (
            e.alias("l")
            .join(e.alias("r"), F.col("l.id") < F.col("r.id"))
            .select(
                F.col("l.id").alias("a"),
                F.col("r.id").alias("b"),
                _scaled(cos).alias("cos_i"),
            )
        )
        return pairs.filter(F.col("cos_i") >= 3500)

    q["embedding_near_dup"] = embedding_near_dup

    def knn_join_sample(spark, sf):
        e = _t(spark, sf, "embeddings").select(
            F.col("vec_id").alias("id"), F.col("embedding").alias("v")
        )
        left = e.filter(F.col("id") < 20).select(
            F.col("id").alias("a"), F.col("v").alias("va")
        )
        right = e.filter(F.col("id") < 500).select(
            F.col("id").alias("b"), F.col("v").alias("vb")
        )
        pairs = left.join(F.broadcast(right), F.col("a") != F.col("b")).select(
            "a", "b", _scaled(cosine_cols_expr("va", "vb")).alias("cos_i")
        )
        w = Window.partitionBy("a").orderBy(F.col("cos_i").desc(), F.col("b"))
        return pairs.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= 3)

    q["knn_join_top3"] = knn_join_sample

    # ---- text analysis ----
    def lang_id(spark, sf):
        d = _t(spark, sf, "documents")
        return d.select("doc_id", lang_id_expr(F.col("text")).alias("lang_detected"))

    q["lang_id_heuristic"] = lang_id

    def token_counts(spark, sf):
        d = _t(spark, sf, "documents")
        return d.select(
            "doc_id",
            token_count_expr(F.col("text")).alias("ws_tokens"),
            bpe_ish_token_count_expr(F.col("text")).alias("bpe_tokens"),
        )

    q["token_counts"] = token_counts

    def fingerprint(spark, sf):
        d = _t(spark, sf, "documents")
        return d.select("doc_id", fingerprint_expr(F.col("text")).alias("fp"))

    q["doc_fingerprint"] = fingerprint

    def quality(spark, sf):
        from aiwhispr_spark.operators.textstats import quality_features

        d = _t(spark, sf, "documents")
        feats = quality_features(d, "text")
        return feats.select(
            "doc_id",
            "n_tokens",
            _scaled(F.col("mean_word_len")).alias("mean_word_len_i"),
            _scaled(F.col("stopword_ratio")).alias("stopword_ratio_i"),
            _scaled(F.col("quality_score")).alias("quality_i"),
        )

    q["quality_features"] = quality

    def repetition_signals(spark, sf):
        # Gopher-rule repetition filters: duplicate-line char fraction (lines
        # synthesized deterministically — text + its first-50-chars twice) and
        # top-bigram fraction over the raw text
        from aiwhispr_spark.operators.textstats import (
            dup_line_frac_expr,
            top_bigram_frac_expr,
        )

        d = _t(spark, sf, "documents")
        synth = F.concat_ws(
            "\n", F.col("text"), F.substring("text", 1, 50), F.substring("text", 1, 50)
        )
        return d.select(
            "doc_id",
            _scaled(dup_line_frac_expr(synth)).alias("dup_line_frac_i"),
            _scaled(top_bigram_frac_expr(F.col("text"))).alias("top_bigram_frac_i"),
        )

    q["repetition_signals"] = repetition_signals

    def hash_split(spark, sf):
        # deterministic train/val/test assignment by content-stable hash
        # (md5 prefix mod 100): the reproducible split every training corpus
        # needs — no RNG, no shuffle, pure scan-speed expression
        d = _t(spark, sf, "documents")
        bucket = (
            F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 4), 16, 10)
            .cast("long")
            % 100
        )
        split = (
            F.when(bucket < 80, F.lit("train"))
            .when(bucket < 90, F.lit("validation"))
            .otherwise(F.lit("test"))
        )
        return d.select("doc_id", split.alias("split"))

    q["hash_split_assign"] = hash_split

    def rendezvous_shards(spark, sf):
        # HRW crawl-fleet sharding (operators/sharding.py): argmax of the
        # keyed md5 fingerprint over a 5-shard fleet — zero-exchange JVM
        # expression; the minimal-churn property is unit-test-pinned.
        from aiwhispr_spark.operators.sharding import rendezvous_assign

        d = _t(spark, sf, "documents").select(
            F.concat(
                F.lit("https://h"),
                (F.col("doc_id") % 40).cast("string"),
                F.lit(".org/p/"),
                F.col("doc_id").cast("string"),
            ).alias("url")
        )
        fleet = [f"fetcher-{c}" for c in "abcde"]
        return rendezvous_assign(d, fleet)

    q["url_rendezvous_shards"] = rendezvous_shards

    def percolate(spark, sf):
        # Reverse search (fulltext.py::percolate_conjunctive): a saved-query
        # registry matched against every doc in ONE shared pass.  Fixture
        # exercises conjunction (q2), duplicate query terms (q5), a
        # never-matching term (q4), and a token-less query (q6 → vacuous
        # conjunction, matches ALL docs); oracle = closed-form match sets.
        from aiwhispr_spark.operators.fulltext import percolate_conjunctive

        d = _t(spark, sf, "documents").select(
            "doc_id",
            F.concat(
                F.lit("alpha beta w"),
                (F.col("doc_id") % 5).cast("string"),
                F.lit(" gamma q"),
                (F.col("doc_id") % 3).cast("string"),
            ).alias("text"),
        )
        reg = spark.createDataFrame(
            [
                ("q1", "alpha w0"),
                ("q2", "gamma q1 w2"),
                ("q3", "alpha beta"),
                ("q4", "zzz alpha"),
                ("q5", "beta beta gamma"),
                ("q6", "   "),
            ],
            "query_id string, query string",
        )
        return percolate_conjunctive(d, reg).withColumnRenamed("id", "doc_id")

    q["percolate_matches"] = percolate

    def gopher_filter(spark, sf):
        # Gopher rule panel (textstats.py::gopher_rules): the corpus text is
        # decorated deterministically by k = doc_id % 12 so every rule fires
        # both ways — k%4==0 appends two bullet lines + an ellipsis line
        # (line rules), k%3==0 appends a '### ... …' symbol tail (symbol
        # rule), k%5==0 appends a stopword sentence (stopword rule flips),
        # k%7==0 appends a numeric run (alpha-word rule).  Oracle mirrors
        # the decoration and the integer cross-multiplied rules exactly.
        from aiwhispr_spark.operators.textstats import gopher_rules

        d = _t(spark, sf, "documents")
        k = F.col("doc_id") % 12
        decorated = d.select(
            "doc_id",
            F.concat(
                F.col("text"),
                F.when(k % 4 == 0, F.lit("\n- bullet one\n- bullet two\ntail line ...")).otherwise(F.lit("")),
                F.when(k % 3 == 0, F.lit(" ### ... … ### ...")).otherwise(F.lit("")),
                F.when(k % 5 == 0, F.lit(" the cat sat with that to be of and")).otherwise(F.lit("")),
                F.when(k % 7 == 0, F.lit(" 101 202 303 404 505 606 707 808 909 111 222 333")).otherwise(F.lit("")),
                # k==8: twenty bullet lines on top of the k%4 decoration's
                # 2 bullets + 1 tail → 22 of 24 lines bullet-started > 90%
                # (bullet rule fails); k==9: 78 one-char words drag the mean
                # word length under 3 (mean-length rule fails)
                F.when(
                    k == 8,
                    F.concat_ws("", F.array(*[F.lit(f"\n- b{i}") for i in range(20)])),
                ).otherwise(F.lit("")),
                F.when(
                    k == 9,
                    F.lit(" " + " ".join(list("abcdefghijklmnopqrstuvwxyz") * 3)),
                ).otherwise(F.lit("")),
            ).alias("text"),
        )
        return gopher_rules(decorated, min_words=40, max_words=90)

    q["gopher_quality_filter"] = gopher_filter

    def weighted_sample(spark, sf):
        # Efraimidis–Spirakis weighted sampling without replacement
        # (mixing.py::weighted_sample_without_replacement): 5 docs per
        # source, inclusion odds ∝ n_chars, priorities content-addressed
        # via the md5→60-bit fingerprint — the oracle re-derives ln(u)/w
        # from the identical dyadic rational and must elect the SAME docs.
        from aiwhispr_spark.operators.mixing import weighted_sample_without_replacement

        d = _t(spark, sf, "documents").select("doc_id", "source", "n_chars")
        return weighted_sample_without_replacement(
            d, k=5, weight_col="n_chars", group_col="source", id_col="doc_id"
        )

    q["weighted_sample_es"] = weighted_sample

    def compaction(spark, sf):
        # small-file compaction planner (maintenance.py::compaction_plan):
        # synthetic file listing derived from documents (one "file" per doc,
        # size = n_chars, dir = source), binned to 1 KiB targets; oracle =
        # the identical exclusive-prefix-sum window in SQL.
        from aiwhispr_spark.operators.maintenance import compaction_plan

        listing = _t(spark, sf, "documents").select(
            F.col("source").alias("part_dir"),
            F.concat(F.lit("part-"), F.lpad(F.col("doc_id").cast("string"), 6, "0"))
            .alias("file_name"),
            F.col("n_chars").cast("long").alias("size_bytes"),
        )
        return compaction_plan(listing, target_bytes=1024)

    q["compaction_plan"] = compaction

    def xml_native(spark, sf):
        # Native XML scan roundtrip (sources/xmlsrc.py): real XML files
        # (root element, attribute rows, &quot;/&amp;/&lt;/&#10; escapes,
        # missing Lang attr every 7th row) read via Spark 4's core XML
        # source with an explicit schema; DuckDB cannot read XML, so the
        # oracle recomputes the decoded rows from the fixture arithmetic —
        # any parse/normalization damage breaks the value hash.
        from aiwhispr_spark.sources import xmlsrc
        from aiwhispr_spark.sources.xmlsrc import read_xml, write_xml_fixture

        path = _fixture_path("aiwhispr_xml_300", xmlsrc)
        write_xml_fixture(spark, path)
        df = read_xml(spark, path)
        return df.select(
            F.col("_Id").alias("doc_id"),
            F.col("_Lang").alias("lang"),
            F.length("_Body").cast("long").alias("n_chars"),
            F.md5("_Body").alias("body_md5"),
            F.col("_Score").cast("long").alias("score"),
        )

    q["xml_native_roundtrip"] = xml_native

    def spectral_peaks(spark, sf):
        # FFT dominant-frequency detection (multimodal.py::
        # spectral_peak_features): 120 PCM-16 clips with the major tone on
        # bin 3 + i%40 (exact bin centers → zero leakage) and a quarter-
        # amplitude minor tone; oracle = the closed-form bins and the exact
        # integer bin→Hz arithmetic (8000 Hz / 1024 fft → 78125 per bin).
        from aiwhispr_spark.operators.multimodal import make_tone_clip, spectral_peak_features

        rows = [
            (
                f"clip-{i}",
                make_tone_clip(
                    peak_bin=3 + i % 40,
                    amp=6000 + (i % 5) * 1000,
                    minor_bin=50 + (i * 7) % 400,
                ),
            )
            for i in range(120)
        ]
        clips = spark.createDataFrame(rows, "media_id string, payload binary")
        return spectral_peak_features(clips)

    q["audio_spectral_peaks"] = spectral_peaks

    def video_stats(spark, sf):
        # REAL Y4M video decode (multimodal.py::decode_y4m) + every-3rd-
        # frame sampling + exact-integer luma stats: 40 gradient clips whose
        # dims/frame-count/fps/bytes all derive from closed-form arithmetic
        # (Y[f][r][c] = (i*11+f*7+r*5+c*3) % 251); the C420 chroma stride is
        # load-bearing — a wrong skip shears every later frame's sum.  Two
        # corrupt payloads pin the NULL-row contract.  Oracle re-derives the
        # sums with range() cross joins (exact, no float).
        from aiwhispr_spark.operators.multimodal import make_gradient_video, video_frame_stats

        rows = [(f"vid-{i}", make_gradient_video(i)) for i in range(40)]
        rows.append(("bad-magic", b"NOTY4M W8 H6\nFRAME\n" + bytes(48)))
        rows.append(("truncated", make_gradient_video(1)[:-10]))
        clips = spark.createDataFrame(rows, "media_id string, payload binary")
        out = video_frame_stats(clips, every_k=3)
        # nullable-int gate sentinel (NULL BIGINTs stringify differently per
        # engine); NULL semantics stay in the operator, pinned by pytest
        return out.select(
            "media_id",
            *[
                F.coalesce(F.col(c), F.lit(-1)).cast(t).alias(c)
                for c, t in [
                    ("frame_idx", "int"),
                    ("width", "int"),
                    ("height", "int"),
                    ("fps_num", "int"),
                    ("y_sum", "long"),
                    ("y_mean_mi", "long"),
                ]
            ],
        )

    q["video_frame_stats"] = video_stats

    def copula_polarity(spark, sf):
        # negation-aware copula is_a mining (hearst.py::extract_copula_isa):
        # eight sentence shapes by doc_id % 8 — plain assertion, "is not",
        # "was never" with a two-word predicate, "isn't", "is no longer"
        # ending at a comma, a hyphenated predicate, "an", and a no-copula
        # control; oracle = the SAME RE2-safe regex over the SAME built
        # sentences in DuckDB (polarity must flip on every negated form).
        from aiwhispr_spark.operators.hearst import extract_copula_isa

        d = _t(spark, sf, "documents").select("doc_id")
        m = F.col("doc_id") % 8
        i = F.col("doc_id").cast("string")
        sent = (
            F.when(m == 0, F.concat(F.lit("Acme"), i, F.lit(" Corp is a vendor.")))
            .when(m == 1, F.concat(F.lit("Beta"), i, F.lit(" Ltd is not a vendor.")))
            .when(m == 2, F.concat(F.lit("Gamma"), i, F.lit(" was never a data broker.")))
            .when(m == 3, F.concat(F.lit("Delta"), i, F.lit(" isn't a supplier.")))
            .when(m == 4, F.concat(F.lit("Epsilon"), i, F.lit(" is no longer a partner, sadly.")))
            .when(m == 5, F.concat(F.lit("Zeta"), i, F.lit(" Group is a fast-growing startup.")))
            .when(m == 6, F.concat(F.lit("Eta"), i, F.lit(" is an engineer.")))
            .otherwise(F.concat(F.lit("Theta"), i, F.lit(" has a vendor line and no copula")))
        )
        chunks = d.select(i.alias("url"), sent.alias("text_chunk"))
        return extract_copula_isa(chunks)

    q["copula_isa_polarity"] = copula_polarity

    def scd2(spark, sf):
        # SCD2 versioned fact store merge (temporal.py::scd2_apply): 60 open
        # + 15 closed versions, a 146-row change batch exercising every arm —
        # no-op vs open value (all 40 touched keys' first rows), version
        # chaining (2 effective changes per key), in-batch consecutive-dup
        # collapse (20 tail rows), stale rejection (ts=50 < valid_from), and
        # 20 untouched keys.  Oracle = the same merge algorithm as SQL
        # windows over the same range-built frames.
        from aiwhispr_spark.operators.temporal import scd2_apply

        e60 = spark.range(60).select(
            F.concat(F.lit("E"), F.col("id")).alias("subj"),
            F.lit("color").alias("pred"),
            F.concat(F.lit("c"), F.col("id") % 5).alias("obj"),
            (F.col("id") + 100).alias("valid_from"),
            F.lit(None).cast("long").alias("valid_to"),
        )
        closed = spark.range(60).filter(F.col("id") % 4 == 0).select(
            F.concat(F.lit("E"), F.col("id")).alias("subj"),
            F.lit("color").alias("pred"),
            F.concat(F.lit("old"), F.col("id")).alias("obj"),
            F.col("id").alias("valid_from"),
            (F.col("id") + 100).alias("valid_to"),
        )
        store = e60.unionByName(closed)
        d = F.col("id")
        batch = spark.range(146).select(
            F.concat(
                F.lit("E"),
                F.when(d < 120, d % 40).when(d < 140, d - 120).otherwise((d - 140) * 6),
            ).alias("subj"),
            F.lit("color").alias("pred"),
            F.when(d < 120, F.concat(F.lit("c"), (d % 40 + F.floor(d / 40)) % 5))
            .when(d < 140, F.concat(F.lit("c"), (d - 120 + 2) % 5))
            .otherwise(F.lit("stale"))
            .alias("obj"),
            F.when(d < 120, 200 + d).when(d < 140, 320 + (d - 120)).otherwise(F.lit(50))
            .cast("long")
            .alias("ts"),
        )
        out = scd2_apply(store, batch)
        return out.select(
            "subj",
            "pred",
            "obj",
            F.col("valid_from").cast("long").alias("valid_from"),
            F.coalesce(F.col("valid_to"), F.lit(-1)).cast("long").alias("valid_to_s"),
        )

    q["kg_scd2_history"] = scd2

    def ir_eval(spark, sf):
        # IR ranking-quality panel (evaluation.py::ranking_metrics): 30
        # queries × 10-deep runs vs 5-judgment gold lists, graded gains;
        # per-query parity alternates which gold docs are retrievable so
        # MRR/recall/NDCG all vary.  The 1/log2(r+1) discount enters as an
        # integer literal table — every runtime step exact BIGINT, oracle
        # carries the SAME literals.
        from aiwhispr_spark.operators.evaluation import ranking_metrics

        w = [10000, 6309, 5000, 4307, 3869, 3562, 3333, 3155, 3010, 2891]
        qs = spark.range(30)
        rs = spark.range(1, 11).select(F.col("id").alias("r"))
        res = qs.crossJoin(rs).select(
            F.col("id").alias("query_id"),
            F.concat(F.lit("d"), (F.col("id") * 13 + F.col("r") * 7) % 50).alias("doc_id"),
            F.col("r").cast("int").alias("rank"),
        )
        gs = spark.range(1, 6).select(F.col("id").alias("g"))
        qr = qs.crossJoin(gs).select(
            F.col("id").alias("query_id"),
            F.concat(
                F.lit("d"),
                (F.col("id") * 13 + F.col("g") * 7 + ((F.col("g") + F.col("id")) % 2) * 25)
                % 50,
            ).alias("doc_id"),
            ((F.col("id") + F.col("g")) % 3 + 1).cast("long").alias("gain"),
        )
        return ranking_metrics(res, qr, k=10, discounts_mi=w)

    q["ir_ranking_eval"] = ir_eval

    def wand(spark, sf):
        # WAND/MaxScore pruned top-k (fulltext.py::wand_topk): the pruned
        # result must HASH-MATCH the oracle's UNPRUNED exact scoring — the
        # pruned≡exact gate pattern (ivf_all_probe_equals_exact).  Length-
        # normalized weighted tf, all-integer arithmetic.
        from aiwhispr_spark.operators.fulltext import build_inverted_index, wand_topk

        d = _t(spark, sf, "documents")
        idx = build_inverted_index(d)
        dl = idx.groupBy("id").agg(F.sum("tf").cast("long").alias("dl"))
        return wand_topk(idx, dl, {"spark": 40, "query": 30, "data": 20, "the": 5}, k=15)

    q["wand_topk_pruned"] = wand

    def simrank(spark, sf):
        # bounded SimRank (graph.py::simrank_bounded, 3 rounds) over the
        # linked corpus's host graph — structural similarity from shared
        # in-linkers.  Integer-exact: ONE floor division per round, so the
        # unrolled-CTE oracle (_simrank_sql) reproduces every bit; rows
        # flooring to 0 drop in BOTH engines (sparsity is part of the
        # contract).  Symmetric → a < b output half.
        from aiwhispr_spark.operators.graph import simrank_bounded
        from aiwhispr_spark.operators.linkgraph import extract_links, host_edges

        docs = spark.read.parquet(_ensure_link_corpus())
        edges = host_edges(extract_links(docs)).select(
            F.col("src_host").alias("src"), F.col("dst_host").alias("dst")
        )
        s = simrank_bounded(edges, rounds=3)
        return s.filter(F.col("a") < F.col("b")).select(
            "a", "b", F.col("s").alias("simrank_i")
        )

    q["host_simrank_3"] = simrank

    def kg_construct(spark, sf):
        # SPARQL CONSTRUCT (graph_query.py::bgp_construct): acquisitions
        # with a known acquiree location rewrite into a derived graph —
        # controls / has_presence_in / located_in triples, DISTINCT set
        # semantics.  One explode of a 3-struct array (no union fan-out).
        from aiwhispr_spark.operators.graph_query import bgp_construct

        t = _corpus_triples(spark)
        return bgp_construct(
            t,
            where=[("?y", "acquired", "?x"), ("?x", "based_in", "?city")],
            template=[
                ("?y", "controls", "?x"),
                ("?y", "has_presence_in", "?city"),
                ("?x", "located_in", "?city"),
            ],
        )

    q["kg_construct_derived"] = kg_construct

    def tpch_q5ish(spark, sf):
        # TPC-H Q5 (local supplier volume): same-nation customer/supplier
        # revenue inside one region + an order-date year window.  Plan
        # shape: region→nation→supplier collapse into ONE broadcast dim;
        # lineitem⋈orders is the only big shuffle; the same-nation predicate
        # rides the customer equi-join.  Dates never reach the output.
        r = _t(spark, sf, "region").filter(F.col("r_name") == "ASIA")
        n = _t(spark, sf, "nation")
        s = _t(spark, sf, "supplier")
        c = _t(spark, sf, "customer")
        o = _t(spark, sf, "orders").filter(
            (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1998-01-01")
        )
        li = _t(spark, sf, "lineitem")
        dim = (
            s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
            .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
            .select("s_suppkey", "s_nationkey", "n_name")
        )
        j = (
            li.join(o, li.l_orderkey == o.o_orderkey)
            .join(F.broadcast(dim), li.l_suppkey == dim.s_suppkey)
            .join(
                c,
                (o.o_custkey == c.c_custkey) & (c.c_nationkey == dim.s_nationkey),
            )
        )
        # per-row cents round FIRST, then an EXACT integer sum — a
        # round-after-float-sum would be summation-order dependent
        return (
            j.groupBy("n_name")
            .agg(
                F.sum(
                    F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100)
                    .cast("long")
                )
                .cast("long")
                .alias("revenue_ci")
            )
            .orderBy(F.col("revenue_ci").desc(), F.col("n_name"))
        )

    q["tpch_q5_local_supplier"] = tpch_q5ish

    def tpch_q4ish(spark, sf):
        # TPC-H Q4 (order priority checking), adapted to this schema's
        # columns: count orders per priority that have AT LEAST ONE
        # late-shipped line (l_shipdate > o_orderdate).  The EXISTS
        # becomes a LEFT SEMI join — the probe side never fans out on
        # multi-line orders, and the non-equi predicate rides the join.
        o = _t(spark, sf, "orders").filter(
            (F.col("o_orderdate") >= "1997-01-01")
            & (F.col("o_orderdate") < "1997-10-01")
        )
        li = _t(spark, sf, "lineitem").select("l_orderkey", "l_shipdate")
        hit = o.join(
            li,
            (o.o_orderkey == li.l_orderkey) & (li.l_shipdate > o.o_orderdate),
            "left_semi",
        )
        return (
            hit.groupBy("o_orderpriority")
            .agg(F.count("*").cast("long").alias("order_count"))
            .orderBy("o_orderpriority")
        )

    q["tpch_q4_priority_exists"] = tpch_q4ish

    def tpch_q6ish(spark, sf):
        # TPC-H Q6 (forecast revenue change): pure scan-side predicate —
        # every filter pushes into the parquet scan, the agg is one
        # map-side-combinable sum of per-row cents.  No joins, no python.
        li = _t(spark, sf, "lineitem").filter(
            (F.col("l_shipdate") >= "1997-01-01")
            & (F.col("l_shipdate") < "1998-01-01")
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        return li.agg(
            F.sum(
                F.round(F.col("l_extendedprice") * F.col("l_discount") * 100)
                .cast("long")
            )
            .cast("long")
            .alias("revenue_ci"),
            F.count("*").cast("long").alias("n_lines"),
        )

    q["tpch_q6_forecast_revenue"] = tpch_q6ish

    def tpch_q10ish(spark, sf):
        # TPC-H Q10 (returned-item reporting): revenue lost to 'R' lines
        # for one quarter's orders, per customer with their nation.  The
        # nation dim broadcasts; lineitem⋈orders is the only big shuffle;
        # top 20 via TakeOrderedAndProject on the scaled-int revenue.
        c = _t(spark, sf, "customer")
        n = _t(spark, sf, "nation")
        o = _t(spark, sf, "orders").filter(
            (F.col("o_orderdate") >= "1997-01-01")
            & (F.col("o_orderdate") < "1997-04-01")
        )
        li = _t(spark, sf, "lineitem").filter(F.col("l_returnflag") == "R")
        j = (
            li.join(o, li.l_orderkey == o.o_orderkey)
            .join(c, o.o_custkey == c.c_custkey)
            .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        )
        return (
            j.groupBy("c_custkey", "c_name", "n_name")
            .agg(
                F.sum(
                    F.round(
                        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100
                    ).cast("long")
                )
                .cast("long")
                .alias("revenue_ci")
            )
            .orderBy(F.col("revenue_ci").desc(), F.col("c_custkey"))
            .limit(20)
        )

    q["tpch_q10_returned_items"] = tpch_q10ish

    def tpch_q14ish(spark, sf):
        # TPC-H Q14 (promotion effect): promo revenue share for one
        # month, part dim broadcast; the share is integer cross-multiplied
        # basis points (promo_ci*10000 div total_ci) — no float division.
        p = _t(spark, sf, "part").select("p_partkey", "p_type")
        li = _t(spark, sf, "lineitem").filter(
            (F.col("l_shipdate") >= "1997-03-01")
            & (F.col("l_shipdate") < "1997-06-01")
        )
        cents = F.round(
            F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100
        ).cast("long")
        agg = (
            li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
            .agg(
                F.sum(F.when(F.col("p_type") == "PROMO", cents).otherwise(0))
                .cast("long")
                .alias("promo_ci"),
                F.sum(cents).cast("long").alias("total_ci"),
            )
        )
        return agg.select(
            "promo_ci",
            "total_ci",
            F.expr("promo_ci * 10000L div total_ci").alias("promo_share_bp"),
        )

    q["tpch_q14_promo_share"] = tpch_q14ish

    def mw_relatedness(spark, sf):
        # Milne–Witten relatedness (linkgraph.py::milne_witten_relatedness)
        # between mined entities from shared mention docs — the coherence
        # signal of collective entity linking.  Counts ride the hub-capped
        # _overlap_pairs wedge; the WLM ln-ratio is ONE closed-form float
        # step over four exact ints, identical in the oracle.
        from aiwhispr_spark.functions.udfs import extract_triples_df
        from aiwhispr_spark.operators.linkgraph import milne_witten_relatedness
        from aiwhispr_spark.plans.kg_pipeline import docs_to_chunks

        docs = spark.read.parquet(_ensure_simple_corpus())
        t = extract_triples_df(docs_to_chunks(docs))
        rel = t.select(F.col("url").alias("key"), F.col("subj").alias("item"))
        return milne_witten_relatedness(rel)

    q["entity_relatedness_mw"] = mw_relatedness

    def spell(spark, sf):
        # noisy-channel "did you mean" (fulltext.py::spell_correct_terms):
        # typo'd, exact, and unmatchable query terms; rank = edits asc,
        # corpus freq desc, token asc; no-candidate terms emit NO row.
        from aiwhispr_spark.operators.fulltext import build_inverted_index, spell_correct_terms

        d = _t(spark, sf, "documents")
        idx = build_inverted_index(d)
        return spell_correct_terms(
            idx, ["sparc", "qeury", "data", "zzzzqx"], max_edits=2
        )

    q["spell_correct_terms"] = spell

    def kappa(spark, sf):
        # Cohen's κ (evaluation.py::cohen_kappa): a 70%-agreement panel AND
        # an anti-correlated panel (κ < 0 — exercises the pmod floor-div
        # fix; Spark div truncates, DuckDB // floors).  Exact integer
        # cross-multiplied formula, −20000 degenerate sentinel via pytest.
        from aiwhispr_spark.operators.evaluation import cohen_kappa

        d = _t(spark, sf, "documents").select("doc_id")
        base = d.select(
            F.concat(F.lit("c"), F.col("doc_id") % 4).alias("label_a"),
            F.when(
                F.col("doc_id") % 10 < 7, F.concat(F.lit("c"), F.col("doc_id") % 4)
            )
            .otherwise(F.concat(F.lit("c"), (F.col("doc_id") + 1) % 4))
            .alias("label_b"),
        )
        anti = d.select(
            F.concat(F.lit("c"), F.col("doc_id") % 4).alias("label_a"),
            F.concat(F.lit("c"), (F.col("doc_id") + 1) % 4).alias("label_b"),
        )
        return (
            cohen_kappa(base).select(F.lit("panel").alias("arm"), "n", "agree", "kappa_mi")
            .unionByName(
                cohen_kappa(anti).select(F.lit("anti").alias("arm"), "n", "agree", "kappa_mi")
            )
        )

    q["annotator_agreement_kappa"] = kappa

    def scd2_crawl(spark, sf):
        # SCD2 composed with the CRAWL-DERIVED dated facts (temporal.py::
        # extract_dated_facts semantics re-derived on documents): per
        # (subj, year) the deterministic min-obj is elected FIRST (the
        # "pre-aggregate or it's nondeterministic" contract asof_join
        # shares), then scd2_apply folds the year stream into interval
        # history from an empty store — entity location history as a
        # versioned table.
        from aiwhispr_spark.operators.temporal import scd2_apply

        d = _t(spark, sf, "documents").select("doc_id")
        facts = d.select(
            F.concat(F.lit("Entity_"), F.col("doc_id") % 37).alias("subj"),
            F.lit("based_in").alias("pred"),
            F.concat(F.lit("City"), (F.col("doc_id") * 3) % 13).alias("obj"),
            (1990 + F.col("doc_id") % 30).cast("long").alias("ts"),
        )
        changes = facts.groupBy("subj", "pred", "ts").agg(F.min("obj").alias("obj"))
        empty_store = spark.createDataFrame(
            [], "subj string, pred string, obj string, valid_from long, valid_to long"
        )
        out = scd2_apply(empty_store, changes)
        return out.select(
            "subj",
            "pred",
            "obj",
            F.col("valid_from").cast("long").alias("valid_from"),
            F.coalesce(F.col("valid_to"), F.lit(-1)).cast("long").alias("valid_to_s"),
        )

    q["kg_scd2_from_crawl"] = scd2_crawl

    def span_corrupt(spark, sf):
        # T5 span corruption (packing.py::span_corruption): content-seeded
        # masking (md5 doc_id:pos), contiguous runs collapse to ONE
        # <extra_id_K> sentinel; Spark side is a single zero-shuffle array
        # fold, the oracle is the relational twin (explode + lag window +
        # filtered string_aggs) — two totally different formulations must
        # produce byte-identical input/target strings.
        from aiwhispr_spark.operators.packing import span_corruption

        d = _t(spark, sf, "documents")
        return span_corruption(d, noise_pct=15)

    q["span_corruption_t5"] = span_corrupt

    def collective(spark, sf):
        # one-round collective disambiguation (linking.py::
        # collective_disambiguation): coherence FLIPS the prior choice
        # (B_k + strong rel to the neighbor's obvious reading beats A_k's
        # higher prior), identity-context bonus, and singleton docs fall
        # back to pure prior.  Oracle mirrors the round as SQL windows over
        # identical range-built frames.
        from aiwhispr_spark.operators.linking import collective_disambiguation

        k10 = spark.range(10).select(F.col("id").alias("k"))
        pri = k10.select(
            F.concat(F.lit("s"), "k").alias("surface"),
            F.concat(F.lit("A"), "k").alias("entity"),
            F.lit(6000).cast("long").alias("prior_i"),
        ).unionByName(
            k10.select(
                F.concat(F.lit("s"), "k").alias("surface"),
                F.concat(F.lit("B"), "k").alias("entity"),
                F.lit(5000).cast("long").alias("prior_i"),
            )
        )
        k9 = spark.range(9).select(F.col("id").alias("k"))
        e1 = F.concat(F.lit("B"), "k")
        e2 = F.concat(F.lit("A"), F.col("k") + 1)
        e3 = F.concat(F.lit("A"), "k")
        rel = k9.select(
            F.least(e1, e2).alias("a"), F.greatest(e1, e2).alias("b"),
            F.lit(9000).cast("long").alias("rel_i"),
        ).unionByName(
            k9.select(
                F.least(e3, e2).alias("a"), F.greatest(e3, e2).alias("b"),
                F.lit(1000).cast("long").alias("rel_i"),
            )
        )
        d60 = spark.range(60).select(F.col("id").alias("d"))
        m0 = d60.select(
            F.concat(F.lit("d"), "d").alias("doc"),
            F.lit(0).cast("int").alias("mention_id"),
            F.concat(F.lit("s"), F.col("d") % 9).alias("surface"),
        )
        m1 = d60.filter(F.col("d") % 5 != 0).select(
            F.concat(F.lit("d"), "d").alias("doc"),
            F.lit(1).cast("int").alias("mention_id"),
            F.when(F.col("d") % 7 == 3, F.concat(F.lit("s"), F.col("d") % 9))
            .otherwise(F.concat(F.lit("s"), F.col("d") % 9 + 1))
            .alias("surface"),
        )
        return collective_disambiguation(m0.unionByName(m1), pri, rel)

    q["collective_entity_linking"] = collective

    def rrf(spark, sf):
        # reciprocal-rank fusion (fulltext.py::rrf_fuse) of two arms with
        # incomparable scores — tf-rank['spark','query'] and tf-rank['data']
        # — fused purely by rank (1e6 div (60+rank), exact ints).  The
        # ≤20-row rank windows run on already-limited arm outputs.
        from pyspark.sql.window import Window

        from aiwhispr_spark.operators.fulltext import (
            build_inverted_index,
            rrf_fuse,
            search_terms,
        )

        d = _t(spark, sf, "documents")
        idx = build_inverted_index(d)

        def ranked(terms):
            arm = search_terms(idx, terms, k=20)
            w = Window.orderBy(F.col("score").desc(), F.col("id"))
            return arm.withColumn("rank", F.row_number().over(w))

        return rrf_fuse([ranked(["spark", "query"]), ranked(["data"])], k=15)

    q["rrf_fusion_topk"] = rrf

    def epochs(spark, sf):
        # UniMax epoch-capped budget water-fill (mixing.py::
        # epoch_allocation): 12 sources, 40k-token budget, 3-epoch cap —
        # small sources cap out, the freed budget redistributes equally;
        # exact closed-form flags (no iteration), mirrored in SQL.
        from aiwhispr_spark.operators.mixing import epoch_allocation

        src = spark.range(13).select(
            F.concat(F.lit("src"), F.col("id")).alias("source"),
            F.when(F.col("id") == 12, F.lit(0))
            .otherwise(1000 * (F.col("id") + 1) + (F.col("id") % 3) * 50)
            .cast("long")
            .alias("n_tokens"),
        )
        return epoch_allocation(src, budget_tokens=40000, max_epochs=3)

    q["epoch_budget_waterfill"] = epochs

    def contrastive(spark, sf):
        # contrastive training triplets (dedup.py::contrastive_triplets)
        # composed on the md5-minhash near-dup pairs: positive = best
        # near-dup (max scaled jaccard, tie min id), negative = argmin
        # md5(anchor:cand) over a hash-probe subset, with ALL near-dup
        # partners excluded (false negatives poison the loss).  Oracle
        # recomposes the whole chain on _minhash_cte.
        from aiwhispr_spark.operators.dedup import contrastive_triplets, minhash_lsh_pairs_md5

        d0 = _t(spark, sf, "documents").filter(F.col("doc_id") < 300).select("doc_id", "text")
        aug = d0.select(
            (F.col("doc_id") + 10000).alias("doc_id"),
            F.concat("text", F.lit(MINHASH_TAIL)).alias("text"),
        )
        alld = d0.unionByName(aug)
        pairs = minhash_lsh_pairs_md5(alld, "text", "doc_id")
        return contrastive_triplets(pairs, alld.select("doc_id"))

    q["contrastive_triplets"] = contrastive

    def transitions(spark, sf):
        # first-order event-type Markov matrix (temporal.py::
        # event_transitions) over each user's (ts, event_id)-ordered
        # timeline; exact integer row-normalized probabilities.
        from aiwhispr_spark.operators.temporal import event_transitions

        return event_transitions(_t(spark, sf, "events"))

    q["event_markov_transitions"] = transitions

    def conductance(spark, sf):
        # per-community conductance (graph_query.py::community_conductance)
        # over the LPA partition — cut/min(vol, 2m−vol) as exact ints; the
        # community-level quality twin of kg_modularity's partition score.
        from aiwhispr_spark.operators.graph_query import (
            community_conductance,
            label_propagation_communities,
        )

        edges = _entity_edges(spark)
        labels = label_propagation_communities(edges, rounds=3)
        return community_conductance(edges, labels)

    q["kg_community_conductance"] = conductance

    def fim_q(spark, sf):
        # fill-in-the-middle transform (packing.py::fim_transform): a
        # content-seeded coin picks 50% of docs, two md5 cut points split
        # the token stream into prefix/middle/suffix for PSM reordering.
        # Spark side is three codegen array slices; the oracle re-derives
        # the segments relationally (explode + index-range string_aggs) —
        # byte-identical segments AND exact cut arithmetic (% (n+1) over
        # an 8-hex-digit md5 prefix) must agree.
        from aiwhispr_spark.operators.packing import fim_transform

        d = _t(spark, sf, "documents")
        return fim_transform(d, fim_pct=50)

    q["fim_transform_psm"] = fim_q

    def inverse_pred_q(spark, sf):
        # inverse-predicate detection (paraphrase.py::inverse_predicates):
        # closed-form relations over 20 entities — 'acquired_by' mirrors
        # 'acquired' on residues < 15 and asserts 5 non-mirror junk facts
        # (+3 offset) on residues >= 15, so the pair scores 7500 (15 of
        # min(20,20)); 'partnered_with' is built symmetric (diagonal row,
        # score 10000); 'owns' points at a disjoint object space (no
        # row).  Triples repeat across doc_ids to pin the distinct
        # collapse, same fixture discipline as kg_predicate_paraphrases.
        from aiwhispr_spark.operators.paraphrase import inverse_predicates

        d = _t(spark, sf, "documents").select("doc_id")
        r = (F.col("doc_id") % 20).cast("string")
        r7 = ((F.col("doc_id") + 7) % 20).cast("string")
        r3 = ((F.col("doc_id") + 3) % 20).cast("string")
        subj = F.concat(F.lit("E"), r)
        obj = F.concat(F.lit("E"), r7)
        acq = d.select(
            subj.alias("subj"), F.lit("acquired").alias("pred"), obj.alias("obj")
        )
        acq_by = d.filter(F.col("doc_id") % 20 < 15).select(
            obj.alias("subj"), F.lit("acquired_by").alias("pred"), subj.alias("obj")
        ).unionByName(
            d.filter(F.col("doc_id") % 20 >= 15).select(
                subj.alias("subj"),
                F.lit("acquired_by").alias("pred"),
                F.concat(F.lit("E"), r3).alias("obj"),
            )
        )
        part = d.select(
            subj.alias("subj"), F.lit("partnered_with").alias("pred"), obj.alias("obj")
        ).unionByName(
            d.select(
                obj.alias("subj"),
                F.lit("partnered_with").alias("pred"),
                subj.alias("obj"),
            )
        )
        owns = d.select(
            subj.alias("subj"), F.lit("owns").alias("pred"),
            F.concat(F.lit("F"), r).alias("obj"),
        )
        t = acq.unionByName(acq_by).unionByName(part).unionByName(owns)
        return inverse_predicates(t, min_common=2)

    q["kg_inverse_predicates"] = inverse_pred_q

    def preference_q(spark, sf):
        # preference-pair mining (preference.py::preference_pairs): 50
        # urls × 10 snapshot versions synthesized from documents; quality
        # = whitespace token count of the versioned body (repeat() with a
        # non-monotone modular length), so some revisions improve and
        # others regress — only consecutive pairs with gain >= 2 emit.
        # ONE url-keyed lag window, never a global sort.
        from aiwhispr_spark.operators.preference import preference_pairs

        d = _t(spark, sf, "documents").select("doc_id")
        url = F.concat(F.lit("https://ex.org/p"), (F.col("doc_id") % 50).cast("string"))
        v = F.expr("doc_id div 50").cast("long")
        k = ((F.col("doc_id") % 50) + v * F.lit(3)) % 11
        snaps = d.select(
            url.alias("url"),
            (F.lit(1700000000) + v * 86400).cast("long").alias("warc_ts"),
            F.concat(
                F.lit("page v"), v.cast("string"), F.lit(" "),
                F.rtrim(F.repeat(F.lit("body "), k.cast("int"))),
            ).alias("text"),
        ).withColumn("q", F.size(F.split(F.trim(F.col("text")), r"\s+")).cast("long"))
        return preference_pairs(snaps, min_gain=2, quality_col="q")

    q["preference_pairs_crawl"] = preference_q

    def tpch_q18ish(spark, sf):
        # TPC-H Q18 (large-volume customers): orders whose total quantity
        # exceeds 200, joined back to orders+customer, top-100 by price.
        # The HAVING pre-aggregate keys on l_orderkey — the big shuffle —
        # and the survivor set is tiny, so the back-joins broadcast it.
        # o_orderdate emitted AS STRING (date-stringification gotcha).
        c = _t(spark, sf, "customer")
        o = _t(spark, sf, "orders")
        li = _t(spark, sf, "lineitem")
        big = (
            li.groupBy("l_orderkey")
            .agg(F.round(F.sum("l_quantity")).cast("long").alias("sum_qty"))
            .filter(F.col("sum_qty") > 200)
        )
        return (
            o.join(F.broadcast(big), o.o_orderkey == big.l_orderkey)
            .join(c, o.o_custkey == c.c_custkey)
            .select(
                "c_name",
                "c_custkey",
                "o_orderkey",
                F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate_s"),
                F.round(F.col("o_totalprice") * 100).cast("long").alias("totalprice_ci"),
                "sum_qty",
            )
            .orderBy(F.col("totalprice_ci").desc(), F.col("o_orderkey"))
            .limit(100)
        )

    q["tpch_q18_big_orders"] = tpch_q18ish

    def prf_expand(spark, sf):
        # pseudo-relevance-feedback expansion (fulltext.py::
        # prf_expansion_terms): seed ['spark','query'] → top-10 feedback
        # docs → top-8 expansion terms by feedback tf mass; oracle rebuilds
        # the posting table, the feedback election, and the exclusion set
        # in SQL (tie order score desc, df_fb desc, token asc in both).
        from aiwhispr_spark.operators.fulltext import build_inverted_index, prf_expansion_terms

        d = _t(spark, sf, "documents")
        idx = build_inverted_index(d)
        return prf_expansion_terms(
            idx, ["spark", "query"], k_docs=10, k_terms=8, stop_tokens=("the", "a")
        )

    q["prf_query_expansion"] = prf_expand

    def stratified_sample(spark, sf):
        # deterministic stratified sampling: top-3 docs per source by md5
        # rank — the seeded-sample primitive for eval-set construction; one
        # window shuffle on the stratum key
        d = _t(spark, sf, "documents")
        w = Window.partitionBy("source").orderBy(
            F.md5(F.col("doc_id").cast("string")), F.col("doc_id")
        )
        return (
            d.select("doc_id", "source")
            .withColumn("rk", F.row_number().over(w).cast("int"))
            .filter(F.col("rk") <= 3)
        )

    q["stratified_sample_top3"] = stratified_sample

    def pack_sequences(spark, sf):
        # greedy sequence packing per shard (applyInPandas custom operator)
        # vs a DuckDB linear-recursion oracle — the corpus→training-shard
        # planning step
        from aiwhispr_spark.operators.packing import pack_greedy
        from aiwhispr_spark.operators.textstats import token_count_expr

        d = _t(spark, sf, "documents").select(
            "doc_id",
            F.col("source").alias("shard"),
            token_count_expr(F.col("text")).alias("n_tokens"),
        )
        return pack_greedy(d, capacity=256, shard_col="shard")

    q["pack_sequences_greedy"] = pack_sequences

    def udaf_geomean(spark, sf):
        # UDAF surface (§2.8: the reference has none): grouped-agg pandas UDF
        # computing per-source geometric mean of document sizes
        from aiwhispr_spark.functions.extensions import gmean_udaf

        d = _t(spark, sf, "documents").filter(F.col("n_chars") > 0)
        return d.groupBy("source").agg(
            _scaled(gmean_udaf(F.col("n_chars").cast("double"))).alias("gmean_chars_i")
        )

    q["udaf_geomean_chars"] = udaf_geomean

    def udtf_sentences(spark, sf):
        # UDTF surface (§2.8): LATERAL table function exploding each document
        # into (sent_no, sentence) rows via the engine's T5 segmenter
        from aiwhispr_spark.functions.extensions import register_extensions

        register_extensions(spark)
        d = _t(spark, sf, "documents").filter(F.col("doc_id") < 200)
        wrapped = d.select(
            "doc_id",
            F.concat(F.col("text"), F.lit(". Alpha beta! Gamma delta? The end.")).alias("txt"),
        )
        wrapped.createOrReplaceTempView("udtf_sentences_src")
        return spark.sql(
            "SELECT doc_id, t.sent_no, t.sentence "
            "FROM udtf_sentences_src, LATERAL split_sentences_udtf(txt) t"
        )

    q["udtf_sentence_explode"] = udtf_sentences

    def global_sort_rank(spark, sf):
        # generic multi-key global sort (§2.8), made value-checkable by
        # emitting the rank: row_number over (lang, n_chars desc, doc_id).
        # SCALE-SAFE (VERDICT r2 #2): operators/ranking.py global_row_number
        # — range Exchange + per-partition offsets, no single-partition
        # window (plan-asserted in tests/test_plans.py); doc_id is the
        # unique tie-break that makes the order total.
        from aiwhispr_spark.operators.ranking import global_row_number

        d = _t(spark, sf, "documents").select("doc_id", "lang", "n_chars")
        ranked = global_row_number(
            d, [F.col("lang"), F.col("n_chars").desc(), F.col("doc_id")], num_partitions=8
        )
        return ranked.select("doc_id", "rank")

    q["global_sort_rank"] = global_sort_rank

    # ---- generic relational coverage (§2.8 components our engine adds) ----
    def tpch_q1(spark, sf):
        li = _t(spark, sf, "lineitem")
        return (
            li.filter(F.col("l_shipdate") <= F.lit("1998-09-02"))
            .groupBy("l_returnflag", "l_linestatus")
            .agg(
                F.sum("l_quantity").cast("long").alias("sum_qty"),
                # per-row cents round FIRST, then an exact integer sum —
                # round-after-float-sum is summation-order dependent
                F.sum(F.round(F.col("l_extendedprice") * 100).cast("long"))
                .cast("long")
                .alias("sum_base_price_ci"),
                F.sum(
                    F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100)
                    .cast("long")
                )
                .cast("long")
                .alias("sum_disc_price_ci"),
                F.round(F.avg("l_quantity") * 100).cast("long").alias("avg_qty_i"),
                F.count(F.lit(1)).alias("count_order"),
            )
        )

    q["tpch_q1_pricing_summary"] = tpch_q1

    def tpch_q3ish(spark, sf):
        cust = _t(spark, sf, "customer").filter(F.col("c_mktsegment") == "BUILDING")
        orders = _t(spark, sf, "orders")
        li = _t(spark, sf, "lineitem")
        joined = (
            li.join(orders, li.l_orderkey == orders.o_orderkey)
            .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        )
        rev = joined.groupBy("o_orderkey").agg(
            F.sum(
                F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100)
                .cast("long")
            )
            .cast("long")
            .alias("revenue_ci")
        )
        return rev.orderBy(F.col("revenue_ci").desc(), F.col("o_orderkey")).limit(10)

    q["tpch_q3_top_revenue"] = tpch_q3ish

    def region_suppliers(spark, sf):
        r = _t(spark, sf, "region")
        n = _t(spark, sf, "nation")
        s = _t(spark, sf, "supplier")
        return (
            s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
            .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
            .groupBy("r_name")
            .agg(F.count(F.lit(1)).alias("n_suppliers"))
        )

    q["broadcast_chain_region_suppliers"] = region_suppliers

    def chars_percentiles(spark, sf):
        # exact interpolated percentiles per group (the analytics form).
        # NOT the 100 TB plan: F.percentile buffers every group's values in
        # executor memory — see chars_percentiles_approx, the gated sketch
        # twin that IS the scale path.
        d = _t(spark, sf, "documents")
        pct = F.percentile(F.col("n_chars"), F.lit([0.5, 0.9]))
        return d.groupBy("lang").agg(
            _scaled(F.element_at(pct, 1)).alias("p50_i"),
            _scaled(F.element_at(pct, 2)).alias("p90_i"),
        )

    q["chars_percentiles"] = chars_percentiles

    def chars_percentiles_approx(spark, sf):
        # the 100 TB scale path (VERDICT r2 #3): percentile_approx's
        # fixed-memory Greenwald-Khanna sketch instead of F.percentile's
        # per-group value buffer.  At max accuracy the sketch's rank error is
        # < 1 value, so its discrete quantile is EXACT and hash-gateable
        # against DuckDB's quantile_disc — the same probe-all≡exact pattern
        # as ivf_all_probe_equals_exact.  The accuracy↔error trade at
        # production accuracy is tolerance-gated in
        # tests/test_operators.py::test_percentile_approx_tolerance.
        d = _t(spark, sf, "documents")
        pa = F.percentile_approx(F.col("n_chars"), F.lit([0.5, 0.9]), F.lit(2147483647))
        return d.groupBy("lang").agg(
            F.element_at(pa, 1).cast("long").alias("p50_disc"),
            F.element_at(pa, 2).cast("long").alias("p90_disc"),
        )

    q["chars_percentiles_approx"] = chars_percentiles_approx

    def order_date_math(spark, sf):
        # date/math function coverage (§2.8): trunc-to-month, day arithmetic,
        # extract, last_day over the orders table
        # dates are emitted as yyyy-MM-dd STRINGS: the driver compares
        # stringified values, and date objects stringify differently across
        # engines (pandas Timestamp vs datetime.date)
        o = _t(spark, sf, "orders")
        return o.select(
            "o_orderkey",
            F.date_format(F.date_trunc("month", F.col("o_orderdate")), "yyyy-MM-dd").alias("month_start"),
            F.date_format(F.date_add(F.col("o_orderdate"), 30), "yyyy-MM-dd").alias("due_date"),
            F.dayofweek("o_orderdate").cast("int").alias("dow"),
            F.date_format(F.last_day("o_orderdate"), "yyyy-MM-dd").alias("month_end"),
            F.datediff(F.last_day("o_orderdate"), F.col("o_orderdate")).cast("int").alias("days_left"),
        )

    q["order_date_math"] = order_date_math

    def sessionize(spark, sf):
        ev = _t(spark, sf, "events")
        w = Window.partitionBy("user_id").orderBy(F.col("ts"), F.col("event_id"))
        gap = F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts").over(w))
        marked = ev.withColumn(
            "new_session", F.when(gap.isNull() | (gap > 3600), 1).otherwise(0)
        )
        return marked.groupBy("user_id").agg(
            F.sum("new_session").cast("long").alias("n_sessions"),
            F.count(F.lit(1)).alias("n_events"),
        )

    q["events_sessionize"] = sessionize

    # ---- temporal / relational additions (§2.8 components our engine adds) ----
    def asof_purchase_click(spark, sf):
        # as-of join: each purchase gains the latest click by the same user at
        # or before its timestamp (single-shuffle union+window plan)
        from aiwhispr_spark.operators.temporal import asof_join

        ev = _t(spark, sf, "events")
        purchases = ev.filter(F.col("event_type") == "purchase").select(
            "event_id", "user_id", "ts"
        )
        clicks = (
            ev.filter(F.col("event_type") == "click")
            .groupBy("user_id", "ts")
            .agg(F.max("event_id").alias("click_id"))
        )
        out = asof_join(purchases, clicks, on="user_id", value_cols=["click_id"])
        return out.select(
            "event_id", "user_id", F.coalesce("click_id", F.lit(-1)).alias("click_id")
        )

    q["asof_join_purchase_click"] = asof_purchase_click

    def range_join_purchase_clicks(spark, sf):
        # range join via bucketed candidate pruning: clicks within 1h AFTER
        # each purchase, per user (zero-click purchases kept at 0)
        from aiwhispr_spark.operators.temporal import bucketed_range_join

        ev = _t(spark, sf, "events")
        purchases = ev.filter(F.col("event_type") == "purchase").select(
            "event_id", "user_id", "ts"
        )
        clicks = ev.filter(F.col("event_type") == "click").select(
            "user_id", "ts", F.col("event_id").alias("click_id")
        )
        pairs = bucketed_range_join(purchases, clicks, on="user_id")
        counts = pairs.groupBy("event_id").agg(
            F.count(F.lit(1)).cast("long").alias("n_clicks_1h")
        )
        return (
            purchases.join(counts, "event_id", "left")
            .select(
                "event_id",
                "user_id",
                F.coalesce("n_clicks_1h", F.lit(0)).cast("long").alias("n_clicks_1h"),
            )
        )

    q["range_join_purchase_clicks"] = range_join_purchase_clicks

    def lineage_rollup(spark, sf):
        # per-partition lineage manifest rollup (E7): doc counts and byte
        # volumes at (source, lang), per-source, and grand-total grain
        d = _t(spark, sf, "documents")
        return d.rollup("source", "lang").agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").cast("long").alias("sum_chars"),
        )

    q["lineage_rollup"] = lineage_rollup

    def lineage_cube(spark, sf):
        d = _t(spark, sf, "documents")
        return d.cube("source", "lang").agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").cast("long").alias("sum_chars"),
        )

    q["lineage_cube"] = lineage_cube

    def setops_active_custkeys(spark, sf):
        o = _t(spark, sf, "orders")
        a = o.filter(F.year("o_orderdate") == 1995).select("o_custkey")
        b = o.filter(F.year("o_orderdate") == 2000).select("o_custkey")
        c = o.filter(F.col("o_orderpriority") == "1-URGENT").select("o_custkey")
        return a.intersect(b).subtract(c)

    q["setops_active_custkeys"] = setops_active_custkeys

    def minhash_pairs_md5(spark, sf):
        # md5-hash MinHash banding (oracle-checkable twin of the xxhash64 scale
        # path); near-dup pairs guaranteed by unioning a perturbed copy of each
        # doc (doc_id + 10000, trailing words appended) — both engines build
        # the identical augmented corpus
        from aiwhispr_spark.operators.dedup import minhash_lsh_pairs_md5

        d0 = _t(spark, sf, "documents").filter(F.col("doc_id") < 300).select("doc_id", "text")
        aug = d0.select(
            (F.col("doc_id") + 10000).alias("doc_id"),
            F.concat("text", F.lit(MINHASH_TAIL)).alias("text"),
        )
        pairs = minhash_lsh_pairs_md5(d0.unionByName(aug), "text", "doc_id")
        return pairs.select("a", "b", _scaled(F.col("jaccard")).alias("jaccard_i"))

    q["minhash_pairs_md5"] = minhash_pairs_md5

    def minhash_groups_md5(spark, sf):
        # full dedup-group pipeline, value-checked: md5 banding pairs →
        # connected components → min-id keeper per group
        from aiwhispr_spark.operators.canonicalize import connected_components
        from aiwhispr_spark.operators.dedup import minhash_lsh_pairs_md5

        d0 = _t(spark, sf, "documents").filter(F.col("doc_id") < 300).select("doc_id", "text")
        aug = d0.select(
            (F.col("doc_id") + 10000).alias("doc_id"),
            F.concat("text", F.lit(MINHASH_TAIL)).alias("text"),
        )
        alld = d0.unionByName(aug)
        pairs = minhash_lsh_pairs_md5(alld, "text", "doc_id")
        comp = connected_components(pairs.select("a", "b"))
        ids = alld.select(F.col("doc_id").alias("id"))
        return ids.join(
            comp.withColumnRenamed("alias", "id").withColumnRenamed("component", "keep_id"),
            "id",
            "left",
        ).select("id", F.coalesce("keep_id", "id").alias("keep_id"))

    q["minhash_groups_md5"] = minhash_groups_md5

    def dedup_apply_keepers(spark, sf):
        # the dedup DECISION applied: survivors of the full minhash group
        # pipeline (banding → closure → min-id election) — the anti-join shape
        # every dedup consumer runs; value-gated end to end via the md5 twin
        from aiwhispr_spark.operators.canonicalize import connected_components
        from aiwhispr_spark.operators.dedup import minhash_lsh_pairs_md5

        d0 = _t(spark, sf, "documents").filter(F.col("doc_id") < 300).select("doc_id", "text")
        aug = d0.select(
            (F.col("doc_id") + 10000).alias("doc_id"),
            F.concat("text", F.lit(MINHASH_TAIL)).alias("text"),
        )
        alld = d0.unionByName(aug)
        pairs = minhash_lsh_pairs_md5(alld, "text", "doc_id")
        comp = connected_components(pairs.select("a", "b"))
        ids = alld.select(F.col("doc_id").alias("id"))
        keep = ids.join(
            comp.withColumnRenamed("alias", "id").withColumnRenamed("component", "keep_id"),
            "id",
            "left",
        ).select("id", F.coalesce("keep_id", "id").alias("keep_id"))
        return keep.filter(F.col("id") == F.col("keep_id")).select("id")

    q["dedup_apply_keepers"] = dedup_apply_keepers

    def clean_corpus_filter_chain(spark, sf):
        # the C4-style curation chain as ONE declarative plan: language gate ∧
        # quality floor ∧ exact-dedup keeper — the composition a corpus
        # builder actually ships; every leg reuses an already-gated operator
        from aiwhispr_spark.operators.textstats import lang_id_expr, quality_features

        d = _t(spark, sf, "documents")
        feats = quality_features(d, "text")
        w = Window.partitionBy(F.md5("text"))
        keeper = F.min("doc_id").over(w) == F.col("doc_id")
        return (
            feats.withColumn("lang_detected", lang_id_expr(F.col("text")))
            .withColumn("is_keeper", keeper)
            .withColumn("quality_i", _scaled(F.col("quality_score")))
            .filter(
                (F.col("lang_detected") == "en")
                # threshold on the SCALED int (float discipline: the boundary
                # decision must be taken on the identical integer both engines
                # compute, never on a float comparison)
                & (F.col("quality_i") >= 3000)
                & F.col("is_keeper")
            )
            .select("doc_id", "quality_i")
        )

    q["clean_corpus_filter_chain"] = clean_corpus_filter_chain

    def training_mix_pipeline(spark, sf):
        # END-TO-END training-data mix (plans/training.py): lang+quality
        # floor → exact-dedup keeper → 13-gram decontamination against a
        # leaked benchmark (every 50th doc — those flag 100% contaminated
        # and drop) → temperature-weighted source sampling → greedy packing
        # per source shard.  Every stage is individually gated elsewhere;
        # this gate pins the COMPOSITION through the library plan, oracle =
        # the same five stages composed in SQL from the per-stage fragments.
        from aiwhispr_spark.plans.training import build_training_mix

        d = _t(spark, sf, "documents")
        bench = d.filter(F.col("doc_id") % 50 == 0)
        return build_training_mix(d, bench)

    q["training_mix_pipeline"] = training_mix_pipeline

    def e3_triples_inline_svo(spark, sf):
        # E3 value gate: deterministic SVO sentences built from documents in
        # BOTH engines; Spark runs the real mapInPandas triple kernel
        # (sentence split + pattern finditer), DuckDB mirrors it with
        # regexp_extract_all of the same pattern constants
        from aiwhispr_spark.functions.udfs import extract_triples_df

        d = _t(spark, sf, "documents")
        text = F.concat(
            F.lit("Entity_"), (F.col("doc_id") % 37).cast("string"),
            F.lit(" acquired E"), (F.col("doc_id") % 11).cast("string"),
            F.lit(" Corp. Entity_"), (F.col("doc_id") % 37).cast("string"),
            F.lit(" is based in Berlin. Ada Byron works for Entity_"),
            (F.col("doc_id") % 5).cast("string"),
            F.lit(". plain tail words."),
        )
        chunks = d.select(
            F.concat(F.lit("u"), F.col("doc_id").cast("string")).alias("url"),
            F.lit(1).cast("int").alias("chunk_no"),
            text.alias("text_chunk"),
        )
        return extract_triples_df(chunks).select("url", "subj", "pred", "obj")

    q["e3_triples_inline_svo"] = e3_triples_inline_svo

    def cc_label_propagation(spark, sf):
        # E6 value gate: min-label connected components over a deterministic
        # graph (decade stars + bridge chains at user_id % 40 == 9) vs a
        # DuckDB recursive-closure oracle
        from aiwhispr_spark.operators.canonicalize import connected_components

        ev = _t(spark, sf, "events")
        stars = ev.select(
            F.col("user_id").alias("a"),
            (F.col("user_id") - F.col("user_id") % 10).alias("b"),
        )
        bridges = ev.filter(F.col("user_id") % 40 == 9).select(
            F.col("user_id").alias("a"), (F.col("user_id") + 1).alias("b")
        )
        # driver_threshold=0 forces the DISTRIBUTED label-propagation path, so
        # the oracle gates the iterative implementation (the driver union-find
        # path is gated by the equivalence unit test)
        comp = connected_components(
            stars.unionByName(bridges).distinct(), driver_threshold=0
        )
        return comp.select(F.col("alias").alias("node"), "component")

    q["cc_label_propagation"] = cc_label_propagation

    def cc_incremental(spark, sf):
        # Dynamic CC maintenance (canonicalize.py::incremental_components):
        # the merge-applying delta step — old labels + a bridge-edge batch
        # (user_id % 25 == 7 → +13, some endpoints brand-new) must equal a
        # FULL recompute over base ∪ delta, which is exactly what the
        # recursive-closure oracle computes.
        from aiwhispr_spark.operators.canonicalize import (
            connected_components,
            incremental_components,
        )

        ev = _t(spark, sf, "events")
        stars = ev.select(
            F.col("user_id").alias("a"),
            (F.col("user_id") - F.col("user_id") % 10).alias("b"),
        )
        bridges = ev.filter(F.col("user_id") % 40 == 9).select(
            F.col("user_id").alias("a"), (F.col("user_id") + 1).alias("b")
        )
        old = connected_components(
            stars.unionByName(bridges).distinct(), driver_threshold=0
        )
        delta = ev.filter(F.col("user_id") % 25 == 7).select(
            F.col("user_id").alias("a"), (F.col("user_id") + 13).alias("b")
        )
        out = incremental_components(old, delta)
        return out.select(F.col("alias").alias("node"), "component")

    q["cc_incremental_merge"] = cc_incremental

    def kg_triples(spark, sf):
        # E2E pipeline VALUE gate: the real composable path (E1 clean_html UDF
        # → disk-hop roundtrip → C1 mapInPandas chunker with T5 validation →
        # E3 mapInPandas SVO kernel) over the oracle-friendly corpus
        # (make_simple_doc_html: ASCII/English/single-chunk, so every stage
        # has a closed-form DuckDB equivalent — see _kg_e2e_sql).  The
        # multi-chunk / multilingual corpus stays pytest-gated (byte-identity
        # + P/R harness, tests/test_pipeline_pr.py).
        from aiwhispr_spark.functions.udfs import extract_triples_df
        from aiwhispr_spark.plans.kg_pipeline import docs_to_chunks

        docs = spark.read.parquet(_ensure_simple_corpus())
        chunks = docs_to_chunks(docs)
        return extract_triples_df(chunks).select("url", "chunk_no", "subj", "pred", "obj")

    q["kg_triples_synthetic"] = kg_triples

    def kg_session_prov(spark, sf):
        # session-scoped provenance (VERDICT r2 #8, batch twin): gap-based
        # crawl sessions per HOST over the simple corpus (13 hosts × ~12
        # docs, 4043 s between a host's consecutive fetches), joined onto
        # the E1-E3 triple counts per url.  Timestamps get a deterministic
        # (page % 7)·600 s jitter: per-host arrival order is preserved
        # (600·6 < 4043) while consecutive gaps become {3443, 7643} s —
        # straddling the 4000 s threshold, so BOTH the merge and the split
        # branch of the sessionizer carry rows.  The streaming twin
        # (streaming/kg_stream.py::start_kg_stream_sessionized) is pinned
        # equal to this batch assignment in tests/test_streaming_stateful.py.
        from aiwhispr_spark.functions.udfs import extract_triples_df
        from aiwhispr_spark.operators.temporal import assign_crawl_sessions
        from aiwhispr_spark.plans.kg_pipeline import docs_to_chunks

        docs = spark.read.parquet(_ensure_simple_corpus())
        page = F.regexp_extract("url", r"p/(\d+)$", 1).cast("int")
        prepared = docs.select(
            "url",
            F.regexp_extract("url", r"https?://([^/]+)", 1).alias("host"),
            (F.unix_timestamp("warc_ts") + (page % 7) * 600).cast("long").alias("ep"),
        )
        sess = assign_crawl_sessions(
            prepared, key_col="host", ts_col="ep", gap_seconds=4000, tiebreak_col="url"
        )
        counts = (
            extract_triples_df(docs_to_chunks(docs))
            .groupBy("url")
            .agg(F.count(F.lit(1)).cast("long").alias("n_triples"))
        )
        return sess.join(counts, "url", "left").select(
            "url",
            "host",
            "session_id",
            F.coalesce("n_triples", F.lit(0)).cast("long").alias("n_triples"),
        )

    q["kg_session_provenance"] = kg_session_prov

    def q7_pca_map(spark, sf):
        # Q7 (6_Semantic_Search.py:420-437): StandardScaler+PCA(3) over result
        # embeddings for the semantic plot.  pyspark.ml implementation;
        # rows-only check (PCA axes have sign/rotation ambiguity across libs).
        # Output is exploded to SCALAR rows (vec_id, axis, loading_abs_i) —
        # the driver canonicalizer sorts/hashes column values and cannot sort
        # array cells; abs() neutralizes per-axis sign ambiguity.
        from pyspark.ml.feature import PCA, StandardScaler
        from pyspark.ml.functions import array_to_vector, vector_to_array

        emb = _t(spark, sf, "embeddings").filter(F.col("vec_id") < 200)
        vecs = emb.select("vec_id", array_to_vector("embedding").alias("features"))
        scaled = (
            StandardScaler(inputCol="features", outputCol="scaled", withMean=True)
            .fit(vecs)
            .transform(vecs)
        )
        pca = PCA(k=3, inputCol="scaled", outputCol="pca").fit(scaled)
        return pca.transform(scaled).select(
            "vec_id", F.posexplode(vector_to_array("pca")).alias("axis", "loading")
        ).select("vec_id", "axis", _scaled(F.abs("loading")).alias("loading_abs_i"))

    q["q7_pca_map"] = q7_pca_map

    def ivf_all_probe(spark, sf):
        # the IVF dataflow's exactness limit: probing ALL cells must equal
        # brute-force top-k — converts the (approximate-by-construction,
        # rows-only) IVF path into a value-gated query at its n_probe=n_cells
        # boundary.  Exercises the real centroid assignment + cell filter.
        from aiwhispr_spark.operators.similarity import assign_centroids, train_centroids

        emb = _t(spark, sf, "embeddings")
        qvec = [float(x) for x in emb.filter(F.col("vec_id") == 0).first()["embedding"]]
        cents = train_centroids(emb, n_centroids=8)
        assigned = assign_centroids(emb, cents)
        pruned = assigned.filter(F.col("centroid_id").isin(list(range(len(cents)))))
        scored = pruned.select("vec_id", _scaled(cosine_expr("embedding", qvec)).alias("score_i"))
        return scored.orderBy(F.col("score_i").desc(), F.col("vec_id")).limit(10)

    q["ivf_all_probe_equals_exact"] = ivf_all_probe

    def knn_graph(spark, sf):
        # Graph-navigable ANN (similarity.py::build_knn_graph +
        # knn_graph_beam_search) — the NSW/DiskANN-style sibling of the
        # reference's HNSW indexes (qdrantVectorDb.py:270-273 ef=128,
        # postgresVectorDb.py:67-68 M=16/ef=64).  Value gate: the oracle
        # computes the EXACT top-10 independently and pins found_i = 1 for
        # every row — the beam (m=8, ef=32, 4 rounds, 8 entries) must reach
        # recall@10 = 1.0 or the hash diverges.  The beam result feeds the
        # left join only; score_i comes from the same exact JVM cosine the
        # flagship uses, so the gate isolates COVERAGE, not float noise.
        from aiwhispr_spark.operators.similarity import (
            build_knn_graph,
            knn_graph_beam_search,
        )

        emb = _t(spark, sf, "embeddings")
        qvec = [float(x) for x in emb.filter(F.col("vec_id") == 0).first()["embedding"]]
        adj = build_knn_graph(emb, m=8)
        beam = knn_graph_beam_search(adj, emb, qvec, k=10, ef=32, rounds=4, n_entries=8)
        exact = (
            emb.select("vec_id", _scaled(cosine_expr("embedding", qvec)).alias("score_i"))
            .orderBy(F.col("score_i").desc(), F.col("vec_id"))
            .limit(10)
        )
        found = beam.select(F.col("nid").alias("vec_id"), F.lit(1).alias("_hit"))
        return (
            exact.join(found, "vec_id", "left")
            .select(
                "vec_id",
                "score_i",
                F.coalesce(F.col("_hit"), F.lit(0)).cast("long").alias("found_i"),
            )
            .orderBy(F.col("score_i").desc(), F.col("vec_id"))
        )

    q["knn_graph_search"] = knn_graph

    def knn_graph_lsh_tier(spark, sf):
        # The build's >max_build_rows scale path (VERDICT r4 #4,
        # similarity.py::_lsh_knn_edges): sign-LSH bucketed candidates +
        # global-sample backbone + NN-Descent refinement feeding the same
        # per-src top-M election — fully distributed, nothing collected.
        # max_build_rows=10 forces the tier on the fixture; m=16 matches
        # the reference's HNSW M (postgresVectorDb.py:67-68).  Value gate:
        # exact top-10 computed independently by the oracle, found_i = 1
        # pinned for every row (recall@10 = 1.0 at the registered beam
        # point ef=64/6 rounds/32 entries, measured at sf0.01 AND sf0.1;
        # the tier is fully deterministic: seeded planes, md5-ordered
        # backbone, scaled-int sims, id tie-breaks).
        from aiwhispr_spark.operators.similarity import (
            build_knn_graph,
            knn_graph_beam_search,
        )

        emb = _t(spark, sf, "embeddings")
        qvec = [float(x) for x in emb.filter(F.col("vec_id") == 0).first()["embedding"]]
        adj = build_knn_graph(emb, m=16, max_build_rows=10).localCheckpoint()
        beam = knn_graph_beam_search(adj, emb, qvec, k=10, ef=64, rounds=6, n_entries=32)
        exact = (
            emb.select("vec_id", _scaled(cosine_expr("embedding", qvec)).alias("score_i"))
            .orderBy(F.col("score_i").desc(), F.col("vec_id"))
            .limit(10)
        )
        found = beam.select(F.col("nid").alias("vec_id"), F.lit(1).alias("_hit"))
        return (
            exact.join(found, "vec_id", "left")
            .select(
                "vec_id",
                "score_i",
                F.coalesce(F.col("_hit"), F.lit(0)).cast("long").alias("found_i"),
            )
            .orderBy(F.col("score_i").desc(), F.col("vec_id"))
        )

    q["knn_graph_lsh_tier_search"] = knn_graph_lsh_tier

    def knn_graph_incremental(spark, sf):
        # O(delta) ANN-index maintenance (similarity.py::insert_into_
        # knn_graph): build the kNN graph on 80% of the vectors, insert the
        # interleaved 20% delta WITHOUT a rebuild — the incremental ≡ batch
        # contract (cc_incremental_merge / dedup_incremental_two_batch
        # pattern).  The oracle computes the FULL-table exact top-m graph
        # from scratch in DuckDB: the incremental path must land exactly
        # there.  Both engines share (sim desc, dst asc) election and the
        # half-up 1e4 scaling.
        from aiwhispr_spark.operators.similarity import (
            build_knn_graph,
            insert_into_knn_graph,
        )

        emb = _t(spark, sf, "embeddings")
        existing = emb.filter(F.col("vec_id") % 5 != 0)
        delta = emb.filter(F.col("vec_id") % 5 == 0)
        adj = build_knn_graph(existing, m=6)
        refreshed = insert_into_knn_graph(adj, existing, delta, m=6)
        return refreshed.select("src", "dst", "sim_i").orderBy(
            "src", F.desc("sim_i"), "dst"
        )

    q["knn_graph_incremental_insert"] = knn_graph_incremental

    def knn_graph_delete(spark, sf):
        # Delete half of the lifecycle (similarity.py::remove_from_knn_
        # graph): tombstone every 7th vector and eagerly repair only the
        # degraded sources (those that lost an edge); oracle rebuilds the
        # exact top-m graph over the REMAINING set from scratch — repaired
        # ∪ intact must land exactly there.
        from aiwhispr_spark.operators.similarity import (
            build_knn_graph,
            remove_from_knn_graph,
        )

        emb = _t(spark, sf, "embeddings")
        removed = emb.filter(F.col("vec_id") % 7 == 0).select("vec_id")
        remaining = emb.filter(F.col("vec_id") % 7 != 0)
        adj = build_knn_graph(emb, m=6)
        repaired = remove_from_knn_graph(adj, remaining, removed, m=6)
        return repaired.select("src", "dst", "sim_i").orderBy(
            "src", F.desc("sim_i"), "dst"
        )

    q["knn_graph_delete_repair"] = knn_graph_delete

    def ivf_topk_search(spark, sf):
        # IVF-flat ANN scale path (rows-only: approximate by construction;
        # exactness vs brute force gated by tests/test_operators.py recall
        # test).  Deterministic: seeded centroids, scaled-int score ordering.
        from aiwhispr_spark.operators.similarity import (
            assign_centroids,
            ivf_topk,
            train_centroids,
        )

        emb = _t(spark, sf, "embeddings")
        qvec = [float(x) for x in emb.filter(F.col("vec_id") == 0).first()["embedding"]]
        cents = train_centroids(emb, n_centroids=8)
        assigned = assign_centroids(emb, cents)
        top = ivf_topk(assigned, qvec, cents, k=10, n_probe=3)
        return top.select(
            "vec_id", _scaled(F.col("match_score")).alias("score_i")
        ).orderBy(F.col("score_i").desc(), F.col("vec_id"))

    q["ivf_topk_search"] = ivf_topk_search

    def minhash_dedup(spark, sf):
        from aiwhispr_spark.operators.dedup import minhash_dedup_groups

        d = _t(spark, sf, "documents").filter(F.col("doc_id") < 500)
        return minhash_dedup_groups(d, "text", "doc_id")

    q["minhash_dedup_groups"] = minhash_dedup

    def simhash(spark, sf):
        from aiwhispr_spark.operators.dedup import simhash64

        d = _t(spark, sf, "documents").filter(F.col("doc_id") < 500)
        return d.select("doc_id", simhash64(F.col("text")).alias("simhash"))

    q["simhash_fingerprint"] = simhash

    def simhash_near_dup_pairs(spark, sf):
        # SimHash PAIRS dataflow (banded blocking + hamming verify): the
        # 4×15-bit pigeonhole guarantees every pair within hamming ≤ 3 shares
        # a band, so the blocked result EQUALS the all-pairs oracle — near
        # dups guaranteed by unioning a lightly-perturbed copy of each doc
        from aiwhispr_spark.operators.dedup import simhash_pairs

        d0 = _t(spark, sf, "documents").filter(F.col("doc_id") < 200).select("doc_id", "text")
        aug = d0.select(
            (F.col("doc_id") + 10000).alias("doc_id"),
            F.concat("text", F.lit(" tail")).alias("text"),
        )
        pairs = simhash_pairs(d0.unionByName(aug), "text", "doc_id", max_hamming=3)
        return pairs.select("a", "b", F.col("hamming").cast("int").alias("hamming"))

    q["simhash_near_dup_pairs"] = simhash_near_dup_pairs

    def events_sessions_detail(spark, sf):
        # full session reconstruction (the batch twin of the streaming
        # sessionizer): gap > 1h starts a session; emit per-session bounds
        # and counts — one window shuffle + one agg on the same key
        ev = _t(spark, sf, "events")
        w = Window.partitionBy("user_id").orderBy(F.col("ts"), F.col("event_id"))
        gap = F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts").over(w))
        marked = ev.withColumn(
            "new_session", F.when(gap.isNull() | (gap > 3600), 1).otherwise(0)
        ).withColumn("session_no", F.sum("new_session").over(w).cast("int"))
        return marked.groupBy("user_id", "session_no").agg(
            F.min(F.unix_timestamp("ts")).cast("long").alias("session_start"),
            F.max(F.unix_timestamp("ts")).cast("long").alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
        )

    q["events_sessions_detail"] = events_sessions_detail

    def multimodal(spark, sf):
        # real mapInPandas decode plumbing (schema, Arrow batching, explicit
        # decoder table), value-gated: the decoder emits the 16-bucket folded
        # byte histogram — integer-exact, so DuckDB reproduces it from the
        # same ASCII-sanitized payload.  Scalar rows (no arrays) so the driver
        # canonicalizer can sort/hash.
        from aiwhispr_spark.operators.multimodal import (
            byte_bucket_fold_counts,
            extract_features,
        )

        d = _t(spark, sf, "documents").filter(F.col("doc_id") < 200)
        media = d.select(
            F.col("doc_id").cast("string").alias("media_id"),
            F.lit("image").alias("kind"),
            F.encode(F.regexp_replace("text", "[^ -~]", ""), "UTF-8").alias("payload"),
        )
        feats = extract_features(media, decoders={"image": byte_bucket_fold_counts})
        return feats.select(
            "media_id", "n_bytes", F.posexplode("feature").alias("bucket", "cnt")
        ).select(
            "media_id",
            F.col("bucket").cast("int").alias("bucket"),
            F.col("cnt").cast("long").alias("cnt"),
            "n_bytes",
        )

    q["multimodal_features"] = multimodal

    def image_dhash_near_dup(spark, sf):
        # Perceptual image near-dup (multimodal.py::image_dhash +
        # dhash_near_dup_pairs): REAL netpbm decode → 64-bit dHash → 4-band
        # Hamming self-join, EXACT for hamming ≤ 3 by pigeonhole.  Fixture:
        # one 9x8 PGM per doc, pixel (g·131 + r·37 + c·61) mod 251 with
        # group g = doc_id div 4; variant v=3 spikes pixel (0,0) to 255 so
        # in-group pairs land at hamming 0-1 and the threshold bites.  The
        # oracle recomputes every gradient bit closed-form and does the
        # exhaustive pair join — banded ≡ exhaustive is exactly the claim.
        from aiwhispr_spark.operators.multimodal import (
            dhash_near_dup_pairs,
            image_dhash,
        )

        d = _t(spark, sf, "documents").select("doc_id")
        g = F.expr("doc_id div 4")
        v = F.col("doc_id") % 4

        def px(r: int, c: int):
            base = (g * 131 + F.lit(r * 37 + c * 61)) % 251
            if r == 0 and c == 0:
                return F.when(v == 3, F.lit(255)).otherwise(base)
            return base

        pgm = F.concat_ws(
            " ",
            F.lit("P2"), F.lit("9"), F.lit("8"), F.lit("255"),
            *[px(r, c).cast("string") for r in range(8) for c in range(9)],
        )
        media = d.select(
            F.concat(F.lit("img"), F.col("doc_id").cast("string")).alias("media_id"),
            F.encode(pgm, "UTF-8").alias("payload"),
        )
        return dhash_near_dup_pairs(image_dhash(media), max_hamming=3, bands=4)

    q["image_dhash_near_dup"] = image_dhash_near_dup

    def kmeans_clusters(spark, sf):
        # Integer-exact Lloyd k-means over the embeddings table
        # (operators/clustering.py): quantized BIGINT grid, exact integer
        # squared-L2, deterministic lowest-id init, 2 update rounds + final
        # assign.  The oracle unrolls the identical integer iterations in
        # DuckDB list SQL — assignment AND distance hash-gate exactly.
        from aiwhispr_spark.operators.clustering import kmeans_lloyd

        emb = _t(spark, sf, "embeddings")
        out = kmeans_lloyd(emb, vec_col="embedding", id_col="vec_id", k=8, iterations=2)
        return out.select(F.col("id").alias("vec_id"), "cid", "dist_l")

    q["kmeans_domain_clusters"] = kmeans_clusters

    def ntriples_q(spark, sf):
        # RDF N-Triples export (operators/rdf.py) composed over the REAL E3
        # triple kernel output; objects get per-doc hostile suffixes (quote,
        # backslash, newline+tab) so every escape arm is load-bearing.  The
        # oracle wraps the e3 SQL twin with the same replace chain.
        from aiwhispr_spark.functions.udfs import extract_triples_df
        from aiwhispr_spark.operators.rdf import ntriples_lines

        d = _t(spark, sf, "documents")
        text = F.concat(
            F.lit("Entity_"), (F.col("doc_id") % 37).cast("string"),
            F.lit(" acquired E"), (F.col("doc_id") % 11).cast("string"),
            F.lit(" Corp. Entity_"), (F.col("doc_id") % 37).cast("string"),
            F.lit(" is based in Berlin. Ada Byron works for Entity_"),
            (F.col("doc_id") % 5).cast("string"),
            F.lit(". plain tail words."),
        )
        chunks = d.select(
            F.concat(F.lit("u"), F.col("doc_id").cast("string")).alias("url"),
            F.lit(1).cast("int").alias("chunk_no"),
            text.alias("text_chunk"),
        )
        triples = extract_triples_df(chunks)
        doc_id = F.substring(F.col("url"), 2, 18).cast("long")
        suffix = (
            F.when(doc_id % 4 == 0, F.lit(' say "hi"'))
            .when(doc_id % 4 == 1, F.lit(" back\\slash"))
            .when(doc_id % 4 == 2, F.lit(" line1\nline2\ttab"))
            .otherwise(F.lit(""))
        )
        hostile = triples.withColumn("obj", F.concat(F.col("obj"), suffix))
        return ntriples_lines(hostile).select("url", "subj", "line")

    q["ntriples_export"] = ntriples_q

    def kg_negatives(spark, sf):
        # Filtered corrupted-object negative sampling for KG-embedding
        # training (operators/kgscore.py::negative_samples) over the e3
        # triple set: md5-indexed entity vocabulary via the scale-safe
        # global_row_number, no-op corruptions and accidental positives
        # dropped.  DuckDB mirrors the md5 arithmetic + NOT EXISTS filter.
        from aiwhispr_spark.functions.udfs import extract_triples_df
        from aiwhispr_spark.operators.kgscore import negative_samples

        d = _t(spark, sf, "documents")
        text = F.concat(
            F.lit("Entity_"), (F.col("doc_id") % 37).cast("string"),
            F.lit(" acquired E"), (F.col("doc_id") % 11).cast("string"),
            F.lit(" Corp. Entity_"), (F.col("doc_id") % 37).cast("string"),
            F.lit(" is based in Berlin. Ada Byron works for Entity_"),
            (F.col("doc_id") % 5).cast("string"),
            F.lit(". plain tail words."),
        )
        chunks = d.select(
            F.concat(F.lit("u"), F.col("doc_id").cast("string")).alias("url"),
            F.lit(1).cast("int").alias("chunk_no"),
            text.alias("text_chunk"),
        )
        triples = extract_triples_df(chunks)
        return negative_samples(triples, per_triple=2)

    q["kg_negative_samples"] = kg_negatives

    def _entity_edges(spark):
        # shared entity-entity edge view for the graph-analytics queries:
        # the same predicate subset as kg_triangles
        return (
            _corpus_triples(spark)
            .filter(F.col("pred").isin("acquired", "owns", "partnered_with"))
            .select(F.col("subj").alias("src"), F.col("obj").alias("dst"))
        )

    def kg_link_prediction(spark, sf):
        # KG completion: common-neighbor link prediction over the entity
        # graph (graph_query.py::link_prediction_scores) — non-adjacent
        # pairs ranked by the integer-exact Resource Allocation index
        # (Adamic-Adar's float twin stays informational).  Candidates come
        # from the wedge join, never a pair cross-product; oracle = the same
        # wedge/deg/anti-join SQL with '//' integer division.
        from aiwhispr_spark.operators.graph_query import link_prediction_scores

        out = link_prediction_scores(_entity_edges(spark))
        return out.select("a", "b", "n_common", "ra_score_i")

    q["kg_link_prediction"] = kg_link_prediction

    def kg_lpa_communities(spark, sf):
        # Community detection: 3 rounds of deterministic SYNCHRONOUS label
        # propagation (most-frequent neighbor label, min-label ties) —
        # distinct from connected components (cc_label_propagation gates
        # reachability; this gates the vote dynamics).  Oracle = the same 3
        # rounds unrolled as chained CTEs with row_number votes.
        from aiwhispr_spark.operators.graph_query import label_propagation_communities

        return label_propagation_communities(_entity_edges(spark), rounds=3)

    q["kg_lpa_communities"] = kg_lpa_communities

    def kg_clustering_coeff(spark, sf):
        # Local clustering coefficient per entity (graph_query.py::
        # local_clustering_coefficient): exact-integer 2·tri/(deg·(deg−1))
        # composed from the triangle join + degree aggregate — clique-ness
        # of each node's neighborhood.  Oracle = the same triangle/degree
        # SQL with '//' division.
        from aiwhispr_spark.operators.graph_query import local_clustering_coefficient

        return local_clustering_coefficient(_entity_edges(spark))

    q["kg_clustering_coefficient"] = kg_clustering_coeff

    def kg_modularity(spark, sf):
        # Partition-quality gate for the LPA communities: per-community
        # Newman modularity decomposed to the EXACT integer numerator
        # q_num = 4·m·e_in − d_sum² over denominator 4m² (graph_query.py::
        # community_modularity) — zero float math, so the vote dynamics AND
        # the quality metric are both hash-gateable.  Oracle = the unrolled
        # LPA rounds + the same integer aggregates.
        from aiwhispr_spark.operators.graph_query import (
            community_modularity,
            label_propagation_communities,
        )

        e = _entity_edges(spark)
        return community_modularity(e, label_propagation_communities(e, rounds=3))

    q["kg_modularity"] = kg_modularity

    def kg_bgp_aggregate(spark, sf):
        # SPARQL 1.1 aggregates over the pattern matcher (graph_query.py::
        # bgp_aggregate): per city with ≥2 acquired companies based there,
        # count distinct targets and acquirers — GROUP BY + HAVING on BGP
        # bindings.  Oracle = the same conjunctive joins + aggregate in SQL.
        from aiwhispr_spark.operators.graph_query import bgp_aggregate

        return bgp_aggregate(
            _corpus_triples(spark),
            [("?x", "based_in", "?city"), ("?y", "acquired", "?x")],
            group_vars=["city"],
            counts={"n_targets": "x", "n_acquirers": "y"},
            having_min=2,
        )

    q["kg_bgp_aggregate"] = kg_bgp_aggregate

    def mirror_hosts(spark, sf):
        # Content-overlap mirror detection (linkgraph.py::mirror_host_pairs):
        # hosts sharing ≥5 page fingerprints at Jaccard ≥ 0.2 — fixture
        # builds two closed-form mirror families (doc_id%6 hosts, doc_id%80
        # contents; host m5 diverges onto %160) so partial overlap exists.
        from aiwhispr_spark.operators.linkgraph import mirror_host_pairs

        d = _t(spark, sf, "documents")
        pages = d.select(
            F.concat(F.lit("m"), (F.col("doc_id") % 6).cast("string")).alias("host"),
            F.concat(
                F.lit("c"),
                F.when(F.col("doc_id") % 6 == 5, F.col("doc_id") % 160)
                .otherwise(F.col("doc_id") % 80)
                .cast("string"),
            ).alias("text"),
        )
        return mirror_host_pairs(pages, min_shared=5, min_jaccard_i=200_000)

    q["mirror_host_pairs"] = mirror_hosts

    def kg_triple_extent(spark, sf):
        # Temporal KG provenance: fact lifespan across the crawl — per
        # distinct (subj, pred, obj) its first/last observation timestamp,
        # observation count, and distinct source pages
        # (temporal.py::triple_temporal_extent).  The simple corpus repeats
        # each fact in 3 docs (entities cycle mod 50 over 150 docs), so
        # extents are non-trivial; ts is the closed-form 311·i crawl clock.
        from aiwhispr_spark.functions.udfs import extract_triples_df
        from aiwhispr_spark.operators.temporal import triple_temporal_extent
        from aiwhispr_spark.plans.kg_pipeline import docs_to_chunks

        docs = spark.read.parquet(_ensure_simple_corpus())
        t = extract_triples_df(docs_to_chunks(docs))
        obs = t.withColumn(
            "ts", F.regexp_extract(F.col("url"), r"p/(\d+)$", 1).cast("long") * 311
        )
        return triple_temporal_extent(obs)

    q["kg_triple_extent"] = kg_triple_extent

    def anchor_commonness_prior(spark, sf):
        # Entity-linking prior: P(target | anchor surface) as exact integer
        # shares of each anchor's mention total (linkgraph.py::
        # anchor_commonness) — the web-scale anchor dictionary that feeds
        # the disambiguation baseline below.
        from aiwhispr_spark.operators.linkgraph import (
            anchor_aliases,
            anchor_commonness,
            extract_anchors,
        )

        docs = spark.read.parquet(_ensure_link_corpus())
        return anchor_commonness(anchor_aliases(extract_anchors(docs)))

    q["anchor_commonness_prior"] = anchor_commonness_prior

    def mention_disambiguation(spark, sf):
        # Argmax-commonness mention disambiguation (linkgraph.py::
        # disambiguate_by_prior): each anchor resolves to its most-linked
        # target, ties to the smallest url — the deterministic baseline
        # every contextual linker is measured against.  The 'external'
        # anchor has 15 candidate targets, so the argmax is load-bearing.
        from aiwhispr_spark.operators.linkgraph import (
            anchor_aliases,
            anchor_commonness,
            disambiguate_by_prior,
            extract_anchors,
        )

        docs = spark.read.parquet(_ensure_link_corpus())
        return disambiguate_by_prior(
            anchor_commonness(anchor_aliases(extract_anchors(docs)))
        )

    q["mention_disambiguation"] = mention_disambiguation

    def dedup_quality_keepers(spark, sf):
        # Quality-aware keeper election (dedup.py::elect_keepers_by_quality):
        # the same minhash-md5 group pipeline as dedup_apply_keepers, but the
        # keeper is the HIGHEST-QUALITY member (score = text length, ties →
        # min id) — the tail-augmented mirrors are LONGER than their
        # originals, so this provably elects different keepers than min-id.
        from aiwhispr_spark.operators.dedup import (
            elect_keepers_by_quality,
            minhash_lsh_pairs_md5,
        )

        d0 = _t(spark, sf, "documents").filter(F.col("doc_id") < 300).select(
            "doc_id", "text"
        )
        aug = d0.select(
            (F.col("doc_id") + 10000).alias("doc_id"),
            F.concat("text", F.lit(MINHASH_TAIL)).alias("text"),
        )
        alld = d0.unionByName(aug)
        pairs = minhash_lsh_pairs_md5(alld, "text", "doc_id")
        ids = alld.select(F.col("doc_id").alias("id"))
        scores = alld.select(
            F.col("doc_id").alias("id"), F.length("text").cast("long").alias("score_i")
        )
        return elect_keepers_by_quality(ids, pairs, scores)

    q["dedup_quality_keepers"] = dedup_quality_keepers

    def bpe_train_merges(spark, sf):
        # Full BPE tokenizer training, 5 merge rounds (textstats.py::
        # bpe_train): corpus → weighted vocab → per-round corpus-weighted
        # pair argmax (ONE collected row per round — merge tables are driver
        # state in every real trainer) + greedy left-to-right merge fold.
        # Extends bpe_pair_stats (which gates round 1's statistics) to the
        # actual training loop; oracle = 5 rounds unrolled as chained CTEs
        # with DuckDB list_reduce reproducing the same greedy fold.
        from aiwhispr_spark.operators.textstats import bpe_train

        return bpe_train(_t(spark, sf, "documents"), n_merges=5)

    q["bpe_train_merges"] = bpe_train_merges

    def bpe_encode_corpus(spark, sf):
        # The encode half of the BPE tokenizer (textstats.py::bpe_encode):
        # train 5 merges on the corpus, then tokenize the corpus under that
        # table — vocabulary-first (the fold chain runs once per DISTINCT
        # word, never per occurrence).  The oracle re-derives the 5 trained
        # merges AND replays the fold per vocab word in DuckDB list SQL.
        from aiwhispr_spark.operators.textstats import bpe_encode, bpe_train

        d = _t(spark, sf, "documents")
        merges = [
            (r["x"], r["y"])
            for r in bpe_train(d, n_merges=5).orderBy("step").collect()
        ]
        return bpe_encode(d, merges)

    q["bpe_encode_corpus"] = bpe_encode_corpus

    def passage_windows_overlap(spark, sf):
        # RAG-retrieval chunking: fixed 16-token windows advancing by 12
        # (packing.py::passage_windows) — overlapping passages from one
        # split + sequence/slice expansion, pure JVM, no python stage.
        # Complements the byte-compat C1 chunker with the sliding form
        # retrieval corpora actually index.
        from aiwhispr_spark.operators.packing import passage_windows

        return passage_windows(
            _t(spark, sf, "documents"), window=16, stride=12
        )

    q["passage_windows_overlap"] = passage_windows_overlap

    def frontier_politeness_budget(spark, sf):
        # Crawl-scheduler politeness cap (robots.py::politeness_budget):
        # per-host top-3 of the prioritized frontier — host-partitioned
        # row_number, never a global window.  Frontier derived closed-form
        # so DuckDB reproduces it exactly.
        from aiwhispr_spark.operators.robots import politeness_budget

        d = _t(spark, sf, "documents").select("doc_id")
        host = F.concat(F.lit("h"), (F.col("doc_id") % 7).cast("string"))
        frontier = d.select(
            F.concat(
                F.lit("https://"),
                host,
                F.lit(".example.org/p/"),
                F.col("doc_id").cast("string"),
            ).alias("url"),
            host.alias("host"),
            ((F.col("doc_id") * 37) % 101).cast("long").alias("priority_i"),
        )
        return politeness_budget(frontier, k=3)

    q["frontier_politeness_budget"] = frontier_politeness_budget

    def kg_entity_cards(spark, sf):
        # The KG product surface: one card per entity — mention counts by
        # position, distinct source pages, first/last crawl observation,
        # and the rule-based type (graph_query.py::type_entities) — the
        # composition a KG consumer reads before anything else.  Two
        # map-side-combinable aggregates + one entity-keyed join.
        from aiwhispr_spark.functions.udfs import extract_triples_df
        from aiwhispr_spark.operators.graph_query import type_entities
        from aiwhispr_spark.plans.kg_pipeline import docs_to_chunks

        docs = spark.read.parquet(_ensure_simple_corpus())
        t = extract_triples_df(docs_to_chunks(docs)).withColumn(
            "ts", F.regexp_extract(F.col("url"), r"p/(\d+)$", 1).cast("long") * 311
        )
        mentions = t.select(
            F.col("subj").alias("entity"),
            "url",
            "ts",
            F.lit(1).alias("as_subj"),
            F.lit(0).alias("as_obj"),
        ).unionByName(
            t.select(
                F.col("obj").alias("entity"),
                "url",
                "ts",
                F.lit(0).alias("as_subj"),
                F.lit(1).alias("as_obj"),
            )
        )
        stats = mentions.groupBy("entity").agg(
            F.count(F.lit(1)).cast("long").alias("n_mentions"),
            F.sum("as_subj").cast("long").alias("n_as_subj"),
            F.sum("as_obj").cast("long").alias("n_as_obj"),
            F.countDistinct("url").cast("long").alias("n_pages"),
            F.min("ts").cast("long").alias("first_seen"),
            F.max("ts").cast("long").alias("last_seen"),
        )
        return stats.join(type_entities(t.select("subj", "pred", "obj")), "entity")

    q["kg_entity_cards"] = kg_entity_cards

    def _conflict_observations(spark, sf):
        # closed-form conflicting fact observations: 40 subjects × ~12
        # assertions each; every 5th doc asserts a WRONG object (off-by-100)
        # so majority vote and latest-wins genuinely disagree sometimes
        d = _t(spark, sf, "documents").select("doc_id")
        subj = F.concat(F.lit("E"), (F.col("doc_id") % 40).cast("string"))
        wrong = F.col("doc_id") % 5 == 0
        obj = F.concat(
            F.lit("P"),
            F.when(wrong, (F.col("doc_id") % 40) + 100)
            .otherwise(F.col("doc_id") % 40)
            .cast("string"),
        )
        host = F.concat(F.lit("h"), (F.col("doc_id") % 11).cast("string"))
        return d.select(
            subj.alias("subj"),
            F.lit("ceo").alias("pred"),
            obj.alias("obj"),
            host.alias("host"),
            ((F.col("doc_id") * 17) % 500).cast("long").alias("ts"),
            F.concat(F.lit("https://"), host, F.lit("/d/"), F.col("doc_id").cast("string")).alias("url"),
        )

    def kg_fact_resolution(spark, sf):
        # Functional-predicate conflict resolution (temporal.py::
        # resolve_functional_facts): latest-observation-wins with obj-asc
        # ties + the conflict audit (n_distinct_obj, contested flag) — what
        # a KG builder runs over re-crawled assertions before materializing
        # one value per (subj, pred).
        from aiwhispr_spark.operators.temporal import resolve_functional_facts

        return resolve_functional_facts(_conflict_observations(spark, sf))

    q["kg_fact_resolution"] = kg_fact_resolution

    def kg_source_reliability(spark, sf):
        # Truth discovery (temporal.py::source_reliability): majority vote
        # per fact, then per-host agreement share as an exact integer ratio
        # — the first round of TruthFinder-style source weighting.
        from aiwhispr_spark.operators.temporal import source_reliability

        return source_reliability(_conflict_observations(spark, sf))

    q["kg_source_reliability"] = kg_source_reliability

    def deepwalk_skipgram_pairs(spark, sf):
        # DeepWalk training pairs (graph.py::skipgram_pairs): window-2
        # co-occurrence counts from the derandomized walk corpus over the
        # linked-corpus host graph — the step between host_random_walks and
        # an embedding trainer.  One walk-keyed self-join, fan-out bounded
        # by length×2·window.
        from aiwhispr_spark.operators.graph import deterministic_walks, skipgram_pairs
        from aiwhispr_spark.operators.linkgraph import extract_links, host_edges

        docs = spark.read.parquet(_ensure_link_corpus())
        edges = host_edges(extract_links(docs)).select(
            F.col("src_host").alias("src"), F.col("dst_host").alias("dst")
        )
        return skipgram_pairs(
            deterministic_walks(edges, length=4, num_partitions=8), window=2
        )

    q["deepwalk_skipgram_pairs"] = deepwalk_skipgram_pairs

    def bigram_lm_scores(spark, sf):
        # Context-aware LM quality scoring (textstats.py::
        # bigram_logprob_scores): add-one-smoothed corpus-self bigram model —
        # the word-ORDER signal the unigram scorer can't see.  Same
        # integer-logprob discipline (round per bigram TYPE, BIGINT sums).
        from aiwhispr_spark.operators.textstats import bigram_logprob_scores

        return bigram_logprob_scores(_t(spark, sf, "documents"))

    q["bigram_lm_scores"] = bigram_lm_scores

    def winnow_summary(spark, sf):
        # Winnowing fingerprints (operators/fingerprint.py — MOSS, SIGMOD'03):
        # passage-level local fingerprinting, the dedup rung between exact
        # (whole-doc hash) and MinHash (whole-doc set similarity).  Pure JVM
        # expression chain (bound() lambda-materialized, no HOF re-eval),
        # zero shuffle before the per-doc aggregate.  Gate = per-doc count +
        # md5 of the sorted fp:pos set, so one selection-rule divergence
        # (e.g. leftmost instead of rightmost tie-break) flips the hash.
        from aiwhispr_spark.operators.fingerprint import (
            fingerprint_summary,
            winnow_fingerprints,
        )

        fps = winnow_fingerprints(_t(spark, sf, "documents"), k=8, w=4)
        return fingerprint_summary(fps)

    q["winnow_fingerprint_summary"] = winnow_summary

    def winnow_pairs(spark, sf):
        # Shared-fingerprint pair mining with the boilerplate cut (max_df):
        # the 100 TB path — (doc_id, fp) rows grouped by fingerprint, hot
        # fingerprints dropped BEFORE the self-join so one viral boilerplate
        # string can't quadratically explode a reducer.  The df<=50 cut and
        # shared>=20 floor are both replicated in the oracle.
        from aiwhispr_spark.operators.fingerprint import (
            shared_fingerprint_pairs,
            winnow_fingerprints,
        )

        fps = winnow_fingerprints(_t(spark, sf, "documents"), k=8, w=4)
        return shared_fingerprint_pairs(fps, min_shared=20, max_df=50).select(
            F.col("id_a").cast("long"),
            F.col("id_b").cast("long"),
            "shared",
        )

    q["winnow_shared_pairs"] = winnow_pairs

    def cms_hitters(spark, sf):
        # Count-min sketch heavy hitters (operators/sketches.py): fixed
        # 4x256-counter state, md5-seeded buckets, so the WHOLE sketch is
        # deterministic and the oracle rebuilds it exactly — counters,
        # estimates, and the one-sided overcount (over_l = est - true >= 0).
        # Fan-out multiplies distinct tokens (pre-counted), not the stream;
        # the estimate join broadcasts the 1 KiB counter table.
        from aiwhispr_spark.operators.sketches import cms_heavy_hitters

        toks = (
            _t(spark, sf, "documents")
            .select(F.explode(F.split(F.lower("text"), r"\s+")).alias("tok"))
            .filter(F.col("tok") != "")
        )
        return cms_heavy_hitters(toks, depth=4, width=256, k=20)

    q["cms_heavy_hitters"] = cms_hitters

    def textrank_kw(spark, sf):
        # TextRank keywords (operators/keywords.py): PageRank over the
        # content-word co-occurrence graph — vocabulary induction for the KG.
        # Edge construction is distinct-deduped BEFORE the iteration, so the
        # recurrence runs over vocabulary edges, not corpus tokens; the
        # oracle re-derives edges in SQL and reuses the unrolled
        # _pagerank_sql recurrence (same double-math association order).
        from aiwhispr_spark.operators.keywords import textrank_keywords

        return textrank_keywords(_t(spark, sf, "documents"), k=20, iterations=5)

    q["textrank_keywords"] = textrank_kw

    def pmi_colloc(spark, sf):
        # PMI collocations (operators/keywords.py): multi-word surface-form
        # mining.  ONE ln over one double division of exact BIGINT products
        # (cab*N*N / (B*ca*cb)) — the LM-scorer integer-first discipline —
        # so the 1e4-scaled score hashes identically in DuckDB.
        from aiwhispr_spark.operators.keywords import pmi_collocations

        return pmi_collocations(_t(spark, sf, "documents"), min_count=5, k=20)

    q["pmi_collocations"] = pmi_colloc

    def gazetteer_tags(spark, sf):
        # Dictionary (gazetteer) entity tagging (operators/gazetteer.py):
        # lexicon-driven NER with LONGEST-MATCH-WINS — a bigram match
        # consumes both token positions so the inner unigram ('hash' inside
        # 'table hash') must NOT also fire; the coverage anti-join is the
        # gate's point.  Gazetteer broadcast both ways; the coverage cut is
        # a co-partitioned shuffle anti-join (data-sized, never broadcast).
        from aiwhispr_spark.operators.gazetteer import (
            gazetteer_doc_summary,
            tag_gazetteer,
        )

        gaz = spark.createDataFrame(_GAZETTEER, "surface string, etype string")
        m = tag_gazetteer(_t(spark, sf, "documents"), gaz)
        return gazetteer_doc_summary(m)

    q["gazetteer_entity_tags"] = gazetteer_tags

    def extractive_sum(spark, sf):
        # Extractive passage summarization (operators/summarize.py, Luhn
        # family): top-2 ten-token passages per doc by mean content-word tf,
        # earlier-passage tie-break.  Every shuffle keys on doc_id (tf,
        # score, final window) — no global sort, survives 100x scale-up.
        from aiwhispr_spark.operators.summarize import extractive_summary

        return extractive_summary(_t(spark, sf, "documents"), size=10, top=2)

    q["extractive_summary_top2"] = extractive_sum

    def host_shortest_paths(spark, sf):
        # Bounded weighted shortest paths (graph.py::bounded_shortest_paths,
        # Bellman-Ford 6 synchronous rounds) over the link graph, with
        # deterministic md5-derived integer weights (1..5) so min-agg is
        # exact in both engines.  The seed (the max-out-degree host, name
        # tie-break — a sink seed would make the gate vacuous) is a bounded
        # 1-row collect: it IS the query parameter in real use.  Oracle
        # unrolls the same relaxation from the same seed expression.
        from aiwhispr_spark.operators.graph import bounded_shortest_paths
        from aiwhispr_spark.operators.linkgraph import extract_links, host_edges

        docs = spark.read.parquet(_ensure_link_corpus())
        e = host_edges(extract_links(docs)).select(
            F.col("src_host").alias("src"), F.col("dst_host").alias("dst")
        )
        w = (
            F.conv(F.substring(F.md5(F.concat("src", F.lit(">"), "dst")), 1, 2), 16, 10)
            .cast("long")
            % 5
            + 1
        )
        ew = e.withColumn("w", w)
        src0 = (
            ew.groupBy("src", "dst")
            .agg(F.min("w"))  # match the oracle: degree over DEDUPED edges
            .groupBy("src")
            .agg(F.count(F.lit(1)).alias("outd"))
            .orderBy(F.desc("outd"), "src")
            .first()["src"]
        )
        out = bounded_shortest_paths(ew, src0, iterations=6)
        return out.select("node", F.col("cost").alias("cost_l"))

    q["host_shortest_paths_6"] = host_shortest_paths

    def csv_roundtrip(spark, sf):
        # CSV source (sources/csvsrc.py): explicit-schema RFC 4180 read —
        # embedded commas, doubled quotes, a newline inside a quoted field
        # (multiLine; NON-SPLITTABLE, flagged in the module docstring), one
        # bad-BIGINT row that must land in _corrupt_record and be skipped
        # here, never kill the job.  The jsonl_roundtrip twin for CSV.
        from aiwhispr_spark.sources.csvsrc import read_csv

        df = read_csv(spark, _ensure_csv_corpus())
        good = df.where(
            F.col("_corrupt_record").isNull() & F.col("doc_id").isNotNull()
        )
        return good.select(
            "doc_id",
            "lang",
            F.length("text").cast("long").alias("n_chars"),
            F.md5("text").alias("text_md5"),
        )

    q["csv_roundtrip"] = csv_roundtrip

    def url_templates_q(spark, sf):
        # URL-template induction + crawler-trap detection (urlnorm.py::
        # mine_url_templates): four closed-form routes per host — a
        # parametric item route whose per-host expansion count crosses the
        # trap threshold, a static page (many fetches, ONE path — never a
        # trap), a dated calendar route ({mixed}, 4 expansions/host) and a
        # digest route ({hex} via md5, 7 expansions/host).  Oracle = the
        # expected (host, template) rollup from doc-id arithmetic,
        # independent of every regex in the operator.
        from aiwhispr_spark.operators.urlnorm import mine_url_templates

        d = _t(spark, sf, "documents").select("doc_id")
        i = F.col("doc_id")
        h = F.concat(
            F.lit("https://h"), (i % 3).cast("string"), F.lit(".example.org")
        )
        u1 = d.select(F.concat(h, F.lit("/item/"), i.cast("string")).alias("url"))
        u2 = d.select(F.concat(h, F.lit("/about")).alias("url"))
        u3 = d.select(
            F.concat(h, F.lit("/cal/2020-"), (i % 12).cast("string")).alias("url")
        )
        u4 = d.select(
            F.concat(h, F.lit("/blob/"), F.md5((i % 7).cast("string"))).alias("url")
        )
        urls = u1.unionByName(u2).unionByName(u3).unionByName(u4)
        return mine_url_templates(urls, trap_min_paths=50)

    q["url_template_mining"] = url_templates_q

    def readability_q(spark, sf):
        # Flesch readability signals (textstats.py::readability_scores):
        # documents.text is plain words, so a closed-form punctuation tail
        # (1 + doc_id%3 sentences) gives the sentence counter real variance;
        # the word/syllable counts exercise the full corpus vocabulary.
        # Oracle = the byte-same counting rules + integer-div score formulas
        # in DuckDB.
        from aiwhispr_spark.operators.textstats import readability_scores

        d = _t(spark, sf, "documents")
        text = F.concat(
            F.col("text"),
            F.lit("."),
            F.expr("repeat(' More words here!', cast(doc_id % 3 as int))"),
        )
        out = readability_scores(d.select("doc_id", text.alias("text")))
        # wordless docs score NULL by the operator contract; the gate
        # coalesces to a sentinel in BOTH engines (nullable BIGINT -> pandas
        # float64 on the driver path — the line_dedup_boilerplate class)
        sent = F.lit(-(10**15)).cast("long")
        return out.withColumn(
            "fk_grade_i", F.coalesce("fk_grade_i", sent)
        ).withColumn("fre_i", F.coalesce("fre_i", sent))

    q["readability_scores"] = readability_q

    def ccnet_buckets_q(spark, sf):
        # CCNet head/middle/tail bucketing (mixing.py::perplexity_buckets)
        # composed over the REAL corpus-self unigram LM: mean_nll_i negates
        # BEFORE the integer division (Spark `div` truncates toward zero,
        # DuckDB `//` floors — identical only on non-negatives), thresholds
        # are the exact discrete terciles per language (percentile_approx at
        # max accuracy ≡ DuckDB quantile_disc).
        from aiwhispr_spark.operators.mixing import perplexity_buckets
        from aiwhispr_spark.operators.textstats import unigram_logprob_scores

        d = _t(spark, sf, "documents")
        lm = unigram_logprob_scores(d)
        scored = lm.join(d.select("doc_id", "lang"), "doc_id").select(
            "doc_id",
            "lang",
            F.expr("(-sum_logp_i) div n_tokens").alias("mean_nll_i"),
        )
        return perplexity_buckets(scored)

    q["ccnet_perplexity_buckets"] = ccnet_buckets_q

    def kg_extraction_eval(spark, sf):
        # Extraction-quality evaluation (evaluation.py::extraction_prf):
        # the REAL E3 kernel's mined set vs a closed-form gold standard with
        # planted deviations — gold omits 1/4 of the acquired facts (mined
        # fp), adds Phantom acquisitions (fn inside a mined predicate) and a
        # founded_by layer the fixture text never states (gold-only
        # predicate: NULL precision, recall 0).  Oracle = the e3 regex twin
        # INTERSECT the same gold arithmetic.
        from aiwhispr_spark.functions.udfs import extract_triples_df
        from aiwhispr_spark.operators.evaluation import extraction_prf

        d = _t(spark, sf, "documents")
        i = F.col("doc_id")
        text = F.concat(
            F.lit("Entity_"), (i % 37).cast("string"),
            F.lit(" acquired E"), (i % 11).cast("string"),
            F.lit(" Corp. Entity_"), (i % 37).cast("string"),
            F.lit(" is based in Berlin. Ada Byron works for Entity_"),
            (i % 5).cast("string"),
            F.lit(". plain tail words."),
        )
        chunks = d.select(
            F.concat(F.lit("u"), i.cast("string")).alias("url"),
            F.lit(1).cast("int").alias("chunk_no"),
            text.alias("text_chunk"),
        )
        mined = extract_triples_df(chunks).select("subj", "pred", "obj")

        def s(pre, c):
            return F.concat(F.lit(pre), c.cast("string"))

        ent = s("Entity_", i % 37)
        gold = (
            d.where(i % 4 != 0)
            .select(
                ent.alias("subj"),
                F.lit("acquired").alias("pred"),
                F.concat(F.lit("E"), (i % 11).cast("string"), F.lit(" Corp")).alias("obj"),
            )
            .unionByName(
                d.where(i % 6 == 0).select(
                    ent.alias("subj"),
                    F.lit("acquired").alias("pred"),
                    F.lit("Phantom Corp").alias("obj"),
                )
            )
            .unionByName(
                d.select(
                    ent.alias("subj"),
                    F.lit("based_in").alias("pred"),
                    F.lit("Berlin").alias("obj"),
                )
            )
            .unionByName(
                d.select(
                    F.lit("Ada Byron").alias("subj"),
                    F.lit("works_for").alias("pred"),
                    s("Entity_", i % 5).alias("obj"),
                )
            )
            .unionByName(
                d.select(
                    ent.alias("subj"),
                    F.lit("founded_by").alias("pred"),
                    s("Founder_", i % 7).alias("obj"),
                )
            )
        )
        out = extraction_prf(mined, gold)
        # undefined ratios are NULL in the operator; the gate pins them to a
        # -1 sentinel because the driver compare stringifies NULL BIGINTs
        # differently per engine ('None' vs pandas 'nan')
        return out.select(
            "pred",
            "n_pred",
            "n_gold",
            "tp",
            F.coalesce("precision_i", F.lit(-1)).cast("long").alias("precision_i"),
            F.coalesce("recall_i", F.lit(-1)).cast("long").alias("recall_i"),
            F.coalesce("f1_i", F.lit(-1)).cast("long").alias("f1_i"),
        )

    q["kg_extraction_eval"] = kg_extraction_eval

    def kg_attribute_merge(spark, sf):
        # Collective ER over the KG (canonicalize.py::
        # attribute_merge_candidates): Dup_k/Alt_k twins share 3
        # discriminative facts (merge candidates), k%3==0 twins share only 1
        # (dropped by min_shared=2), and EVERY subject shares the
        # (based_in, Berlin) stop-fact whose df=60 > max_df=20 — excluded
        # from evidence entirely, so Berlin-only pairs emit nothing and the
        # wedge join never sees the quadratic key.  Even-k Dup carries an
        # extra owns fact (jaccard 750000 vs 1000000).  Oracle = the
        # expected pair rows from k-arithmetic, dataflow-independent.
        from aiwhispr_spark.operators.canonicalize import (
            attribute_merge_candidates,
        )

        d = _t(spark, sf, "documents").select((F.col("doc_id") % 30).alias("k"))
        k = F.col("k")

        def s(pre, c):
            return F.concat(F.lit(pre), c.cast("string"))

        def tri(frame, subj, pred, obj):
            return frame.select(
                subj.alias("subj"), F.lit(pred).alias("pred"), obj.alias("obj")
            )

        dup, alt = s("Dup", k), s("Alt", k)
        core3 = lambda who, frame: (  # noqa: E731
            tri(frame, who, "works_for", s("C", k % 7))
            .unionByName(tri(frame, who, "located_in", s("T", k % 5)))
            .unionByName(tri(frame, who, "founded_in", s("Y", k)))
        )
        rows = (
            core3(dup, d)
            .unionByName(tri(d.where(k % 2 == 0), dup, "owns", s("P", k)))
            .unionByName(tri(d, dup, "based_in", F.lit("Berlin")))
            .unionByName(core3(alt, d.where(k % 3 != 0)))
            .unionByName(tri(d.where(k % 3 == 0), alt, "works_for", s("C", k % 7)))
            .unionByName(tri(d.where(k % 3 == 0), alt, "located_in", s("X", k)))
            .unionByName(tri(d, alt, "based_in", F.lit("Berlin")))
        )
        return attribute_merge_candidates(rows, min_shared=2, max_df=20)

    q["kg_attribute_merge"] = kg_attribute_merge

    def list_triples_q(spark, sf):
        # Heading-labeled HTML list mining (structured.py::list_triples):
        # per doc — a labeled <ul> (tagged item exercising inner-strip, an
        # empty item that must drop), a labeled <ol> across a newline, an
        # UNLABELED list and a heading separated from its list by a <p>
        # (both must emit nothing).  Oracle = the expected rows from doc-id
        # arithmetic, independent of every regex in the operator.
        from aiwhispr_spark.operators.structured import list_triples

        d = _t(spark, sf, "documents").select("doc_id")
        i = F.col("doc_id")
        html = F.concat(
            F.lit('<html><head><meta property="og:title" content="Page '),
            (i % 20).cast("string"),
            F.lit('"/></head><body><h2>Products</h2><ul><li>Alpha '),
            (i % 4).cast("string"),
            F.lit("</li><li>Beta <b>"),
            (i % 3).cast("string"),
            F.lit("</b></li><li></li></ul><h3>Team Members</h3>\n<ol><li>Member "),
            (i % 5).cast("string"),
            F.lit(
                "</li></ol><ul><li>unlabeled</li></ul>"
                "<h2>Empty</h2><p>x</p><ul><li>far</li></ul></body></html>"
            ),
        )
        docs = d.select(
            F.concat(F.lit("u"), i.cast("string")).alias("url"),
            F.encode(html, "UTF-8").alias("html"),
        )
        return list_triples(docs)

    q["html_list_triples"] = list_triples_q

    def colist_expansion_q(spark, sf):
        # Entity-set expansion by list co-occurrence (structured.py::
        # colist_expansion) COMPOSED through the HTML list miner: closed-form
        # tag/reviewer lists per page, seeds {Tag 0, Person 4}, candidates
        # ranked by shared-list count.  Oracle rebuilds the memberships from
        # doc-id arithmetic (independent of the list regexes) and mirrors
        # the two semi-join aggregates.
        from aiwhispr_spark.operators.structured import colist_expansion, list_triples

        d = _t(spark, sf, "documents").select("doc_id")
        i = F.col("doc_id")
        html = F.concat(
            F.lit('<html><head><meta property="og:title" content="Page '),
            (i % 20).cast("string"),
            F.lit('"/></head><body><h2>Tags</h2><ul><li>Tag '),
            (i % 6).cast("string"),
            F.lit("</li><li>Tag "),
            ((i + 1) % 6).cast("string"),
            F.lit("</li><li>Tag "),
            ((i * 3 + 2) % 6).cast("string"),
            F.lit("</li></ul><h3>Reviewers</h3><ul><li>Person "),
            (i % 9).cast("string"),
            F.lit("</li><li>Person "),
            ((i + 2) % 9).cast("string"),
            F.lit("</li></ul></body></html>"),
        )
        docs = d.select(
            F.concat(F.lit("u"), i.cast("string")).alias("url"),
            F.encode(html, "UTF-8").alias("html"),
        )
        t = list_triples(docs)
        memberships = t.select(
            F.concat_ws("|", "src_url", "pred").alias("list_id"),
            F.col("obj").alias("item"),
        )
        return colist_expansion(memberships, seeds=["Tag 0", "Person 4"])

    q["colist_expansion"] = colist_expansion_q

    def mention_bursts_q(spark, sf):
        # Trending-entity burst detection (temporal.py::mention_bursts):
        # three timeline shapes — sparse baselines (gap days make a single
        # active history day look 7× the trailing average: burst by design),
        # one DENSE entity whose full history yields a burst/non-burst mix,
        # and novelty entities with no history at all (t=0 arm).  Oracle =
        # the same groupBy + RANGE-frame window in DuckDB (the integer-day
        # RANGE frame skipping absent days identically is the cross-engine
        # risk this gate exists for).
        from aiwhispr_spark.operators.temporal import mention_bursts

        d = _t(spark, sf, "documents").select("doc_id")
        i = F.col("doc_id")
        m = (
            d.select(
                F.concat(F.lit("E"), (i % 7).cast("string")).alias("entity"),
                (3 * (i % 5)).alias("day"),
            )
            .unionByName(
                d.select(F.lit("Dense").alias("entity"), (i % 15).alias("day"))
            )
            .unionByName(
                d.where(i % 50 == 0).select(
                    F.concat(F.lit("New"), (i % 100).cast("string")).alias(
                        "entity"
                    ),
                    F.lit(5).cast("long").alias("day"),
                )
            )
        )
        return mention_bursts(m, window_days=7, factor_pm=3000, min_count=3)

    q["mention_bursts"] = mention_bursts_q

    def _dtype_fixture(spark, sf):
        # six closed-form predicates shared by kg_literal_datatypes and
        # kg_datatype_enforce: founded_in mixes years with a 10% 'circa …'
        # text tail, employees mixes integers with a 1-in-7 decimal tail,
        # launched/homepage/ceo/note are pure date/url/proper-name/text
        d = _t(spark, sf, "documents").select("doc_id")
        i = F.col("doc_id")
        subj = F.concat(F.lit("S"), i.cast("string"))

        def tri(pred, obj, frame=d):
            return frame.select(
                subj.alias("subj"), F.lit(pred).alias("pred"), obj.alias("obj")
            )

        year = (1900 + (i % 100)).cast("string")
        rows = (
            tri("founded_in", F.when(i % 10 == 0, F.concat(F.lit("circa "), year)).otherwise(year))
            .unionByName(
                tri(
                    "employees",
                    F.when(
                        i % 7 == 0,
                        F.concat((i % 20).cast("string"), F.lit(".5")),
                    ).otherwise(i.cast("string")),
                )
            )
            .unionByName(
                tri(
                    "launched",
                    F.concat(
                        F.lit("2020-"),
                        F.lpad(((i % 12) + 1).cast("string"), 2, "0"),
                        F.lit("-"),
                        F.lpad(((i % 28) + 1).cast("string"), 2, "0"),
                    ),
                )
            )
            .unionByName(
                tri("homepage", F.concat(F.lit("https://h"), (i % 9).cast("string"), F.lit(".org")))
            )
            .unionByName(
                tri("ceo", F.concat(F.lit("Ada Byron "), (i % 5).cast("string")))
            )
            .unionByName(tri("note", F.lit("plain lowercase words")))
        )
        return rows

    def literal_dtypes_q(spark, sf):
        # Predicate range-datatype induction (ontology.py::
        # infer_literal_datatypes) over the shared six-predicate fixture.
        # Oracle = expected dtype rows from doc-id arithmetic
        # (regex-independent) + the same share/dominance election.
        from aiwhispr_spark.operators.ontology import infer_literal_datatypes

        return infer_literal_datatypes(_dtype_fixture(spark, sf))

    q["kg_literal_datatypes"] = literal_dtypes_q

    def dtype_enforce_q(spark, sf):
        # Constraint enforcement (ontology.py::apply_datatype_constraints)
        # over the same fixture: deviants (circa-years, decimal employee
        # counts) flag conforms_i=0 against the induced dominant dtype.
        # Oracle = the fact rows with dtype/exp/conforms all derived from
        # arithmetic, never from the operator's regexes.
        from aiwhispr_spark.operators.ontology import apply_datatype_constraints

        return apply_datatype_constraints(_dtype_fixture(spark, sf))

    q["kg_datatype_enforce"] = dtype_enforce_q

    def appositive_q(spark, sf):
        # Appositive is_a mining (hearst.py::extract_appositive_isa): a
        # multi-word phrase (head noun elected), a one-word 'an' phrase,
        # plus two decoys — a sentence-final appositive missing its closing
        # comma and a capitalized-word phrase (coordination, not
        # apposition) — that must emit nothing.  Oracle = expected rows from
        # doc-id arithmetic, regex-independent.
        from aiwhispr_spark.operators.hearst import extract_appositive_isa

        d = _t(spark, sf, "documents").select("doc_id")
        i = F.col("doc_id")
        text = F.concat(
            F.lit("Acme"), (i % 7).cast("string"),
            F.lit(" Corp, a family-run software vendor, leads. Beta"),
            (i % 5).cast("string"),
            F.lit(", an engine, ships. Gamma"),
            (i % 3).cast("string"),
            F.lit(", a trailing case. Delta"),
            (i % 2).cast("string"),
            F.lit(", a Thing, said."),
        )
        chunks = d.select(
            F.concat(F.lit("u"), i.cast("string")).alias("url"),
            text.alias("text_chunk"),
        )
        return extract_appositive_isa(chunks)

    q["appositive_isa"] = appositive_q

    def homograph_q(spark, sf):
        # IDN-homograph detection (unicodenorm.py::homograph_pairs): every
        # ascii name, a Cyrillic-а clone on k%4==0 and a Cyrillic-е clone on
        # k%8==0 (three-member families yield the non-spoof Cyrillic-
        # Cyrillic pair too), plus twin-less 'beta' names that must emit
        # nothing.  Oracle = expected pairs from k-arithmetic with the
        # Cyrillic literals inline — skeleton-map independent.
        from aiwhispr_spark.operators.unicodenorm import homograph_pairs

        d = _t(spark, sf, "documents").select((F.col("doc_id") % 40).alias("k"))
        k = F.col("k")
        kc = k.cast("string")
        names = (
            d.select(F.concat(F.lit("acme"), kc).alias("name"))
            .unionByName(
                d.where(k % 4 == 0).select(
                    F.concat(F.lit("аcme"), kc).alias("name")
                )
            )
            .unionByName(
                d.where(k % 8 == 0).select(
                    F.concat(F.lit("acmе"), kc).alias("name")
                )
            )
            .unionByName(
                d.select(F.concat(F.lit("beta"), (k % 10).cast("string")).alias("name"))
            )
        )
        return homograph_pairs(names)

    q["homograph_spoof_pairs"] = homograph_q

    def _host_edge_frame(spark):
        from aiwhispr_spark.operators.linkgraph import extract_links, host_edges

        docs = spark.read.parquet(_ensure_link_corpus())
        return host_edges(extract_links(docs)).select(
            F.col("src_host").alias("src"), F.col("dst_host").alias("dst")
        )

    def cocitation_q(spark, sf):
        # Co-citation similarity (linkgraph.py::cocitation_pairs) over the
        # linked corpus's host graph — the "related sites" wedge join with
        # the hub-fanout cap.  Oracle = the same wedge/deg/jaccard SQL over
        # the closed-form host edge set (_host_edges_sql).
        from aiwhispr_spark.operators.linkgraph import cocitation_pairs

        return cocitation_pairs(_host_edge_frame(spark))

    q["host_cocitation_pairs"] = cocitation_q

    def coupling_q(spark, sf):
        # Bibliographic coupling (linkgraph.py::coupling_pairs) — the
        # transpose wedge (sources citing the same destinations).
        from aiwhispr_spark.operators.linkgraph import coupling_pairs

        return coupling_pairs(_host_edge_frame(spark))

    q["host_coupling_pairs"] = coupling_q

    def scc_q(spark, sf):
        # Bounded-diameter SCC (graph_query.py::strongly_connected_
        # components): a 4-ring (one component, min-node id), three 2-cycles,
        # an acyclic chain and a node pointing INTO the ring — the last two
        # must come out as singletons, not members.  Oracle = the expected
        # (node, scc_id, size) rows from residue arithmetic.
        from aiwhispr_spark.operators.graph_query import (
            strongly_connected_components,
        )

        d = _t(spark, sf, "documents").select("doc_id")
        i = F.col("doc_id")

        def s(pre, c):
            return F.concat(F.lit(pre), c.cast("string"))

        def e(a, b):
            return d.select(a.alias("src"), b.alias("dst"))

        edges = (
            e(s("R", i % 4), s("R", (i + 1) % 4))
            .unionByName(e(s("A", i % 3), s("B", i % 3)))
            .unionByName(e(s("B", i % 3), s("A", i % 3)))
            .unionByName(e(F.lit("C0"), F.lit("C1")))
            .unionByName(e(F.lit("C1"), F.lit("C2")))
            .unionByName(e(F.lit("X"), F.lit("R0")))
        )
        return strongly_connected_components(edges, max_hops=4)

    q["kg_scc_bounded"] = scc_q

    def timeline_q(spark, sf):
        # Entity biography assembly (temporal.py::entity_timeline) composed
        # over the REAL dated-fact extractor on the kg_dated_facts fixture
        # text.  Oracle rebuilds the qualified facts arithmetically, then
        # string_aggs with the same (year, pred, obj, qualifier) total order.
        from aiwhispr_spark.operators.temporal import (
            entity_timeline,
            extract_dated_facts,
        )

        d = _t(spark, sf, "documents").select("doc_id")
        a = (F.col("doc_id") % 37).cast("string")
        b = (F.col("doc_id") % 11).cast("string")
        c = ((F.col("doc_id") * 3) % 13).cast("string")
        y1 = (1980 + F.col("doc_id") % 40).cast("string")
        y2 = (1990 + F.col("doc_id") % 30).cast("string")
        text = F.concat(
            F.lit("Entity_"), a, F.lit(" acquired E"), b, F.lit(" Corp in "),
            y1, F.lit(". "),
            F.lit("Entity_"), a, F.lit(" has been based in City"), c,
            F.lit(" since "), y2, F.lit("."),
        )
        chunks = d.select(
            F.concat(F.lit("u"), F.col("doc_id").cast("string")).alias("url"),
            text.alias("text_chunk"),
        )
        return entity_timeline(extract_dated_facts(chunks))

    q["kg_entity_timeline"] = timeline_q

    def soft404_q(spark, sf):
        # Soft-404 detection (maincontent.py::soft404_signals): an error
        # shell (marker + short → flagged), a LONG article that merely
        # mentions a 404 (marker but not flagged), and clean pages.  Oracle
        # = the same title/strip/marker transforms in DuckDB over the
        # byte-same constructed html (global+dotall regexp_replace flags are
        # the cross-engine risk this gate pins).
        from aiwhispr_spark.operators.maincontent import soft404_signals

        d = _t(spark, sf, "documents").select("doc_id")
        i = F.col("doc_id")
        filler = F.expr("repeat(' filler words here', 40)")
        html = F.when(
            i % 5 == 0,
            F.concat(
                F.lit("<html><title>404 Error - Page Not Found</title><body><p>"
                      "The page you requested does not exist.</p></body></html>")
            ),
        ).when(
            i % 5 == 1,
            F.concat(
                F.lit("<html><title>History of the 404 error</title><body><p>"),
                filler,
                F.lit(" page not found lore continues.</p></body></html>"),
            ),
        ).otherwise(
            F.concat(
                F.lit("<html><title>Doc "),
                (i % 9).cast("string"),
                F.lit("</title><body><p>regular content "),
                (i % 7).cast("string"),
                F.lit("</p></body></html>"),
            )
        )
        docs = d.select(
            F.concat(F.lit("u"), i.cast("string")).alias("url"),
            F.encode(html, "UTF-8").alias("html"),
        )
        return soft404_signals(docs)

    q["soft404_detect"] = soft404_q

    def attribution_q(spark, sf):
        # Indirect source attribution (quotes.py::extract_attributions):
        # one well-formed frame per doc, a pronoun source that must drop,
        # and a following sentence the claim must not swallow.  Oracle =
        # expected rows from doc-id arithmetic.
        from aiwhispr_spark.operators.quotes import extract_attributions

        d = _t(spark, sf, "documents").select("doc_id")
        i = F.col("doc_id")
        text = F.concat(
            F.lit("According to Analyst"), (i % 9).cast("string"),
            F.lit(", revenue grew "), (i % 30).cast("string"),
            F.lit(" percent. This trailing sentence stays out. "
                  "According to They, nothing holds."),
        )
        chunks = d.select(
            F.concat(F.lit("u"), i.cast("string")).alias("url"),
            text.alias("text_chunk"),
        )
        return extract_attributions(chunks)

    q["according_to_claims"] = attribution_q

    def authority_q(spark, sf):
        # Authority-weighted entity mentions (salience.py::
        # authority_weighted_mentions): mentions derived closed-form from
        # the linked corpus's url indices, weighted by the REAL host-
        # pagerank chain; an unranked-host arm (i%5==0) must count toward
        # n_mentions/n_hosts while adding 0 authority.  Oracle = the same
        # pagerank recurrence unrolled + the mention arithmetic.
        from aiwhispr_spark.operators.linkgraph import host_pagerank
        from aiwhispr_spark.operators.salience import (
            authority_weighted_mentions,
        )

        docs = spark.read.parquet(_ensure_link_corpus())
        pr = host_pagerank(
            docs, damping=0.85, iterations=5, num_partitions=8
        ).select("node", F.round(F.col("pr") * 1000000).cast("long").alias("pr_i"))
        idx = F.regexp_extract("url", r"a/(\d+)$", 1).cast("long")
        ent = F.concat(F.lit("Ent"), (idx % 9).cast("string"))
        m1 = docs.select("url", ent.alias("entity"))
        m2 = docs.where(idx % 2 == 0).select("url", ent.alias("entity"))
        m3 = docs.where(idx % 5 == 0).select(
            F.lit("https://unranked.example.net/x").alias("url"),
            F.lit("Ent0").alias("entity"),
        )
        mentions = m1.unionByName(m2).unionByName(m3)
        return authority_weighted_mentions(mentions, pr)

    q["entity_authority"] = authority_q

    def anchor_edges_q(spark, sf):
        # Typed KG edges from anchor text (linkgraph.py::anchor_typed_edges):
        # homepage / contact (root-relative, exercising resolution) /
        # source-repo anchors plus a 'read more' decoy that must emit
        # nothing; duplicate homepage assertions collapse.  Oracle =
        # expected rows from doc-id arithmetic.
        from aiwhispr_spark.operators.linkgraph import anchor_typed_edges

        d = _t(spark, sf, "documents").select("doc_id")
        i = F.col("doc_id")
        html = F.concat(
            F.lit('<html><head><meta property="og:title" content="Page '),
            (i % 20).cast("string"),
            F.lit('"/></head><body><a href="https://e'),
            (i % 6).cast("string"),
            F.lit('.example/">Official Website</a>'),
            F.lit('<a href="/contact">Contact</a>'),
            F.lit('<a href="https://g.example/r'),
            (i % 4).cast("string"),
            F.lit('">GitHub</a>'),
            F.lit('<a href="https://e'),
            (i % 6).cast("string"),
            F.lit('.example/">official website</a>'),
            F.lit('<a href="https://x.example/y">read more</a></body></html>'),
        )
        docs = d.select(
            F.concat(F.lit("https://w.example/p/"), i.cast("string")).alias("url"),
            F.encode(html, "UTF-8").alias("html"),
        )
        return anchor_typed_edges(docs)

    q["anchor_typed_edges"] = anchor_edges_q

    def domain_rollup_q(spark, sf):
        # Registrable-domain inventory (urlnorm.py::domain_rollup +
        # registrable_domain_expr): a two-level-suffix arm (shop*.co.uk with
        # 4 subdomain hosts), a plain .org arm with 1 host and 3 repeating
        # paths, and a static-path .net arm (n_urls = 1).  Oracle =
        # closed-form per-domain counts from residue arithmetic —
        # suffix-logic independent.
        from aiwhispr_spark.operators.urlnorm import domain_rollup

        d = _t(spark, sf, "documents").select("doc_id")
        i = F.col("doc_id")
        u1 = d.select(
            F.concat(
                F.lit("https://s"), (i % 4).cast("string"),
                F.lit(".shop"), (i % 10).cast("string"),
                F.lit(".co.uk/p/"), i.cast("string"),
            ).alias("url")
        )
        u2 = d.select(
            F.concat(
                F.lit("https://news.example"), (i % 5).cast("string"),
                F.lit(".org/a/"), (i % 3).cast("string"),
            ).alias("url")
        )
        u3 = d.select(
            F.concat(
                F.lit("https://plain"), (i % 7).cast("string"), F.lit(".net/x")
            ).alias("url")
        )
        return domain_rollup(u1.unionByName(u2).unionByName(u3))

    q["domain_rollup"] = domain_rollup_q

    def lang_mismatch_q(spark, sf):
        # Declared-vs-detected language validation (textstats.py::
        # declared_lang_mismatch): declared = the documents.lang column
        # (with a region subtag '-GB' on even ids — primary-subtag split
        # exercised), a 'zz' template-default arm (always mismatches) and a
        # no-attribute arm (no evidence, never flags).  Detected = the REAL
        # stopword-vote heuristic over the tag-stripped text; oracle reuses
        # the lang-detect CTE + declared arithmetic.
        from aiwhispr_spark.operators.textstats import declared_lang_mismatch

        d = _t(spark, sf, "documents")
        i = F.col("doc_id")
        # NULL text/lang ≡ ''/no-declaration — un-coalesced, a NULL field
        # nulls the whole html concat and the operator sees a NULL page
        # while the oracle (which builds its arms from the columns
        # directly) still sees the declared lang (r5 NULL-injection)
        txt = F.coalesce(F.col("text"), F.lit(""))
        lg = F.coalesce(F.col("lang"), F.lit(""))
        declared = F.when(i % 6 == 0, F.lit("zz")).otherwise(
            F.when(i % 2 == 0, F.concat(lg, F.lit("-GB"))).otherwise(lg)
        )
        html = F.when(
            i % 6 == 3,
            F.concat(F.lit("<html><body><p>"), txt, F.lit("</p></body></html>")),
        ).otherwise(
            F.concat(
                F.lit('<html lang="'), declared,
                F.lit('"><body><p>'), txt, F.lit("</p></body></html>"),
            )
        )
        docs = d.select(
            F.concat(F.lit("u"), i.cast("string")).alias("url"),
            F.encode(html, "UTF-8").alias("html"),
        )
        return declared_lang_mismatch(docs)

    q["declared_lang_mismatch"] = lang_mismatch_q

    def ktruss_q(spark, sf):
        # k-truss decomposition (graph_query.py::k_truss, k=4): a K5 clique
        # (every edge support 3 — survives) plus a bowtie of two triangles
        # sharing an edge, which peels in a REAL 2-round cascade (outer
        # edges drop first, the shared edge loses its support and drops
        # next).  Oracle = the 10 surviving clique edges from residue
        # arithmetic.
        from aiwhispr_spark.operators.graph_query import k_truss

        d = _t(spark, sf, "documents").select("doc_id")
        i = F.col("doc_id")

        def s(pre, c):
            return F.concat(F.lit(pre), c.cast("string"))

        clique = d.select(
            s("c", i % 5).alias("src"),
            s("c", (i % 5 + 1 + i % 4) % 5).alias("dst"),
        )
        bow = [("t0", "t1"), ("t0", "t2"), ("t1", "t2"), ("t1", "t3"), ("t2", "t3")]
        bowtie = None
        for a, b in bow:
            arm = d.select(F.lit(a).alias("src"), F.lit(b).alias("dst"))
            bowtie = arm if bowtie is None else bowtie.unionByName(arm)
        return k_truss(clique.unionByName(bowtie), k=4)

    q["kg_ktruss"] = ktruss_q

    def ego_q(spark, sf):
        # Ego-network extraction (graph_query.py::ego_subgraph): a 12-ring
        # with a (r1, r10) chord (the chord is induced AND leaves the
        # distance set unchanged — both facts pinned by the closed form)
        # plus a disconnected x0-x1 component that must stay out.  Seeds
        # ['r0'], radius 3 → nodes at ring distance ≤ 3.
        from aiwhispr_spark.operators.graph_query import ego_subgraph

        d = _t(spark, sf, "documents").select("doc_id")
        i = F.col("doc_id")

        def s(pre, c):
            return F.concat(F.lit(pre), c.cast("string"))

        ring = d.select(
            s("r", F.lpad((i % 12).cast("string"), 2, "0")).alias("src"),
            s("r", F.lpad(((i + 1) % 12).cast("string"), 2, "0")).alias("dst"),
        )
        extra = d.select(F.lit("r01").alias("src"), F.lit("r10").alias("dst")).unionByName(
            d.select(F.lit("x0").alias("src"), F.lit("x1").alias("dst"))
        )
        return ego_subgraph(ring.unionByName(extra), seeds=["r00"], radius=3)

    q["kg_ego_subgraph"] = ego_q

    def void_q(spark, sf):
        # VoID dataset description (rdf.py::void_statistics) over the REAL
        # E1→E3 corpus triples: property partitions + the __dataset__ total
        # in one ROLLUP pass.  Oracle = GROUP BY ROLLUP over the e2e twin.
        from aiwhispr_spark.operators.rdf import void_statistics

        return void_statistics(_corpus_triples(spark))

    q["kg_void_stats"] = void_q

    def sitemap_index_q(spark, sf):
        # Sitemap-index expansion (sources/sitemap.py::parse_sitemap_index):
        # two <sitemap> children per doc (one with lastmod, one without) and
        # a <url> block in the SAME document that must be ignored (mixed
        # files route each block to exactly one parser).  Oracle = expected
        # child rows from doc-id arithmetic.
        from aiwhispr_spark.sources.sitemap import parse_sitemap_index

        d = _t(spark, sf, "documents").select("doc_id")
        i = F.col("doc_id")
        base = F.concat(F.lit("https://h"), (i % 8).cast("string"), F.lit(".example.org"))
        xml = F.concat(
            F.lit("<sitemapindex><sitemap><loc>"), base,
            F.lit("/sm/"), (i % 5).cast("string"),
            F.lit(".xml</loc><lastmod>2024-0"), ((i % 9) + 1).cast("string"),
            F.lit("-15</lastmod></sitemap><sitemap><loc>"), base,
            F.lit("/sm/extra.xml</loc></sitemap><url><loc>"), base,
            F.lit("/page</loc></url></sitemapindex>"),
        )
        sm = d.select(
            F.concat(F.lit("h"), (i % 8).cast("string")).alias("host"),
            xml.alias("sitemap_xml"),
        )
        return parse_sitemap_index(sm)

    q["sitemap_index_expand"] = sitemap_index_q

    def fact_confidence_q(spark, sf):
        # Reliability-weighted fact confidence (temporal.py::
        # fact_confidence) — the feedback half-iteration over the SAME
        # conflict fixture as kg_source_reliability: host reliabilities
        # become vote weights, one vote per (host, fact).  Oracle composes
        # the reliability CTE with the distinct-vote rollup.
        from aiwhispr_spark.operators.temporal import fact_confidence

        return fact_confidence(_conflict_observations(spark, sf))

    q["kg_fact_confidence"] = fact_confidence_q

    def node2vec_q(spark, sf):
        # node2vec second-order biased walks (graph.py::node2vec_walks,
        # weights 1/2/4 ≡ p=2, q=0.5) over a ring-with-chords graph (out-
        # degree 2, so return/distance-1/outward arms all fire).  Oracle =
        # the same md5-indexed weight-expanded picks unrolled per step in
        # DuckDB (fresh column names per stage — lateral alias shadowing).
        from aiwhispr_spark.operators.graph import node2vec_walks

        d = _t(spark, sf, "documents").select("doc_id")
        i = F.col("doc_id")

        def s(c):
            return F.concat(F.lit("n"), c.cast("string"))

        edges = d.select(
            s(i % 8).alias("src"), s((i % 8 + 1) % 8).alias("dst")
        ).unionByName(
            d.select(s(i % 8).alias("src"), s((i % 8 + 2) % 8).alias("dst"))
        )
        return node2vec_walks(edges, length=3)

    q["node2vec_walks"] = node2vec_q

    def rdfs_schema_q(spark, sf):
        # RDFS/OWL-lite schema export (rdf.py::rdfs_schema_from_profile)
        # over the shared six-predicate dtype fixture: object-vs-datatype
        # property election + XSD range map + conformity share.  Oracle =
        # closed-form per-predicate declarations from the fixture arithmetic.
        from aiwhispr_spark.operators.rdf import rdfs_schema_from_profile

        return rdfs_schema_from_profile(_dtype_fixture(spark, sf))

    q["kg_rdfs_schema"] = rdfs_schema_q

    def vocab_stats_q(spark, sf):
        # Zipf/Heaps corpus diagnostics (textstats.py::vocab_stats) over the
        # real documents table (5 languages).  Oracle = the same vocab
        # rollup + lang-partitioned top-10 window in DuckDB.
        from aiwhispr_spark.operators.textstats import vocab_stats

        return vocab_stats(_t(spark, sf, "documents"))

    q["corpus_vocab_stats"] = vocab_stats_q

    def seeded_lp_q(spark, sf):
        # Seeded label propagation (graph_query.py::
        # propagate_labels_from_seeds): a chain whose middle node ties
        # between both seed classes (min-label break), a direct 2-vs-1
        # majority vote, and an unreached component that must surface with
        # NULL labels.  Oracle = the expected assignments as closed-form
        # rows.
        from aiwhispr_spark.operators.graph_query import (
            propagate_labels_from_seeds,
        )

        d = _t(spark, sf, "documents").select("doc_id")
        pairs = [
            ("a0", "m1"), ("m1", "m2"), ("m2", "m3"), ("m3", "b0"),
            ("v", "a0"), ("v", "a1"), ("v", "b0"),
            ("u1", "u2"),
        ]
        edges = None
        for a, b in pairs:
            arm = d.select(F.lit(a).alias("src"), F.lit(b).alias("dst"))
            edges = arm if edges is None else edges.unionByName(arm)
        seeds = spark.createDataFrame(
            [("a0", "org"), ("a1", "org"), ("b0", "person")],
            "node string, label string",
        )
        return propagate_labels_from_seeds(edges, seeds, rounds=3)

    q["kg_seeded_label_propagation"] = seeded_lp_q

    def robots_sitemaps_q(spark, sf):
        # Sitemap directive extraction (robots.py::sitemap_urls_from_robots):
        # mixed-case directive, inline comment, duplicate occurrence (counts
        # once), and Allow/Disallow lines that must stay invisible.  Oracle
        # = expected (host, url) rows from doc-id arithmetic.
        from aiwhispr_spark.operators.robots import sitemap_urls_from_robots

        d = _t(spark, sf, "documents").select("doc_id")
        i = F.col("doc_id")
        h = F.concat(F.lit("h"), (i % 6).cast("string"))
        txt = F.concat(
            F.lit("User-agent: *\nDisallow: /private\n"),
            F.lit("Sitemap: https://"), h, F.lit(".example.org/sitemap"),
            (i % 3).cast("string"), F.lit(".xml  # primary\n"),
            F.lit("siTEmap: https://"), h, F.lit(".example.org/news.xml\n"),
            F.lit("Sitemap: https://"), h, F.lit(".example.org/news.xml\n"),
            F.lit("Allow: /public\n"),
        )
        robots = d.select(h.alias("host"), txt.alias("robots_txt"))
        return sitemap_urls_from_robots(robots)

    q["robots_sitemap_discovery"] = robots_sitemaps_q

    # --- riskiest-first registration order (VERDICT r2 #1) ---------------------
    def host_outlinks(spark, sf):
        # Per-host outlink hygiene (linkgraph.py::host_outlink_profile):
        # volume, destination diversity, self-link count — the link-farm
        # signal.  Oracle aggregates the CLOSED-FORM link set.
        from aiwhispr_spark.operators.linkgraph import (
            extract_links,
            host_outlink_profile,
        )

        docs = spark.read.parquet(_ensure_link_corpus())
        return host_outlink_profile(extract_links(docs))

    q["host_outlink_profile"] = host_outlinks

    def media_sniff(spark, sf):
        # Magic-byte media-type sniffing (multimodal.py::sniff_media_type):
        # 10 payload arms built closed-form from doc_id (incl. the RIFF
        # container subdivision WAVE vs other and a junk arm) — the U4/U5
        # dispatch front.  Oracle = expected type from doc_id arithmetic.
        from aiwhispr_spark.operators.multimodal import sniff_media_type

        arms = {
            0: "503520",        # P5 netpbm_pgm
            1: "503620",        # P6 netpbm_ppm
            2: "52494646AABBCCDD57415645",  # RIFF....WAVE
            3: "52494646000000004156492020",  # RIFF....AVI  -> riff_other
            4: "255044462D312E34",  # %PDF-1.4
            5: "504B030414000000",  # zip local header
            6: "1F8B0800",      # gzip
            7: "89504E470D0A1A0A",  # png
            8: "FFD8FFE000104A46",  # jpeg/JFIF
            9: "0011223344",    # junk -> unknown
        }
        hex_expr = F.lit(arms[9])
        for k in range(9):
            hex_expr = F.when(F.col("doc_id") % 10 == k, F.lit(arms[k])).otherwise(
                hex_expr
            )
        d = _t(spark, sf, "documents").select(
            "doc_id", F.unhex(hex_expr).alias("payload")
        )
        return sniff_media_type(d).select("doc_id", "media_type")

    q["media_type_sniff"] = media_sniff

    def script_profile_q(spark, sf):
        # Unicode-script profiling (textstats.py::script_profile): per-doc
        # Latin/Cyrillic/Greek/Arabic/CJK character counts + precedence
        # argmax, pure-JVM regexp_count over a fixture whose run lengths are
        # closed-form in doc_id — the oracle asserts counts from arithmetic
        # alone (chr()-both-sides discipline), independent of the ranges.
        import os
        import tempfile

        from aiwhispr_spark.operators.textstats import script_profile
        from aiwhispr_spark.sources import synthetic
        from aiwhispr_spark.sources.synthetic import write_script_corpus_parquet

        path = _fixture_path("aiwhispr_script_fixture.parquet", synthetic)
        if not os.path.exists(path):
            write_script_corpus_parquet(path, n_docs=120)
        return script_profile(spark.read.parquet(path))

    q["script_profile"] = script_profile_q

    def rss_atom(spark, sf):
        # RSS 2.0 + Atom feed parsing (sources/feeds.py): entry blocks via
        # one JVM regexp_extract_all, CDATA title unwrap, RFC-822 →
        # ISO day conversion, Atom rel="self" links skipped, linkless
        # entries dropped.  Oracle = closed-form expected rows from (h, j)
        # range arithmetic — independent of every regex here.
        import os
        import tempfile

        from aiwhispr_spark.sources import feeds, synthetic
        from aiwhispr_spark.sources.feeds import parse_feed_entries
        from aiwhispr_spark.sources.synthetic import write_feed_corpus_parquet

        path = _fixture_path("aiwhispr_feed_fixture.parquet", feeds, synthetic)
        if not os.path.exists(path):
            write_feed_corpus_parquet(path, n_hosts=10)
        return parse_feed_entries(spark.read.parquet(path))

    q["rss_atom_entries"] = rss_atom

    def jsonld(spark, sf):
        # schema.org JSON-LD mined into KG triples (operators/structured.py:
        # JVM regex block pull → from_json → array/struct emission; @graph and
        # bare-root authoring styles, either quote style, decoy text/javascript
        # blocks ignored).  Oracle = the CLOSED-FORM expected triples from
        # doc-index arithmetic — independent of the whole parsing chain.
        from aiwhispr_spark.operators.structured import jsonld_triples

        return jsonld_triples(spark.read.parquet(_ensure_structured_corpus()))

    q["jsonld_triples"] = jsonld

    def og_cards(spark, sf):
        # OpenGraph / meta-tag cards: property/name + content in either
        # attribute order and either quote style; <title> inner text cleaned.
        from aiwhispr_spark.operators.structured import meta_cards

        return meta_cards(spark.read.parquet(_ensure_structured_corpus()))

    q["meta_og_cards"] = og_cards

    def infobox(spark, sf):
        # Wiki-style infobox mining: class-scoped table pull (classless decoy
        # tables skipped), th/td pairs, inner <a> tags stripped, page's
        # og:title principal entity as subject (carried through the explode —
        # no self-join).
        from aiwhispr_spark.operators.structured import infobox_triples

        return infobox_triples(spark.read.parquet(_ensure_structured_corpus()))

    q["infobox_triples"] = infobox

    def data_table(spark, sf):
        # Header-keyed data tables (the row-oriented complement of the
        # infobox arm): header row of th cells keys the predicates; ragged
        # cells, empty cells, inner tags, and the th/td decoy table are all
        # exercised by the fixture (synthetic.py::make_structured_doc_html).
        from aiwhispr_spark.operators.structured import data_table_triples

        return data_table_triples(spark.read.parquet(_ensure_structured_corpus()))

    q["data_table_triples"] = data_table

    def structured_stats(spark, sf):
        # The merged structured-KG view: JSON-LD ∪ infobox triples
        # (provenance-tagged) → one map-side-combinable per-entity aggregate.
        # The exchange carries entity-cardinality aggregate rows only.
        from aiwhispr_spark.operators.structured import structured_entity_stats

        return structured_entity_stats(
            spark.read.parquet(_ensure_structured_corpus())
        )

    q["structured_entity_stats"] = structured_stats

    def kg_functional_keys(spark, sf):
        # ER key mining (ontology.py::predicate_key_profile): per-predicate
        # functionality / inverse-functionality over the induced KG — exact
        # max-fanout flags + scaled ratio of distinct subjects (objects) to
        # distinct facts.  Two map-side-combinable degree groupBys, a
        # |preds|-row join, no windows, no python.
        from aiwhispr_spark.operators.ontology import predicate_key_profile

        return predicate_key_profile(_corpus_triples(spark))

    q["kg_functional_keys"] = kg_functional_keys

    def kg_owl_inference(spark, sf):
        # OWL-lite forward chaining (ontology.py::owl_materialize):
        # symmetric (partnered_with), inverseOf (acquired→acquired_by,
        # founded_by→founded), bounded TransitiveProperty (owns, ≤4 hops via
        # the BFS closure).  Origin elected asserted > symmetric > inverse >
        # transitive by ONE min-rank groupBy; oracle = recursive-CTE closure
        # + unioned candidate ranks.
        from aiwhispr_spark.operators.ontology import owl_materialize

        return owl_materialize(
            _corpus_triples(spark),
            symmetric=["partnered_with"],
            inverse={"acquired": "acquired_by", "founded_by": "founded"},
            transitive=["owns"],
            max_hops=4,
        )

    q["kg_owl_inference"] = kg_owl_inference

    def funnel(spark, sf):
        # strictly-ordered product funnel (temporal.py::funnel_conversion):
        # signup → view → click → purchase, earliest-completion greedy
        # chain, exact integer step/first conversion rates.
        from aiwhispr_spark.operators.temporal import funnel_conversion

        return funnel_conversion(
            _t(spark, sf, "events"), ["signup", "view", "click", "purchase"]
        )

    q["funnel_conversion"] = funnel

    def retention(spark, sf):
        # weekly retention triangle (temporal.py::retention_cohorts):
        # cohort = ISO week of first event, activity = distinct
        # (user, week); exact integer retained ratios.
        from aiwhispr_spark.operators.temporal import retention_cohorts

        return retention_cohorts(_t(spark, sf, "events"), max_offset=4)

    q["retention_cohorts"] = retention

    def attribution(spark, sf):
        # last/first-touch conversion attribution (temporal.py::
        # conversion_attribution): 7-day lookback, (ts, event_id) tie-break,
        # '(none)' bucket keeps totals reconciled with conversion count.
        from aiwhispr_spark.operators.temporal import conversion_attribution

        return conversion_attribution(_t(spark, sf, "events"))

    q["conversion_attribution"] = attribution

    def kmv(spark, sf):
        # KMV bottom-k distinct sketch + the Beyer et al. union-merge
        # (sketches.py::kmv_sketch_estimates): per-source token estimates
        # with the exact-count small-set regime, plus the '(all)' merged
        # row; WindowGroupLimit partial bottom-k is the scale path.
        from aiwhispr_spark.operators.sketches import kmv_sketch_estimates

        return kmv_sketch_estimates(_t(spark, sf, "documents"), k=16)

    q["kmv_distinct_sketch"] = kmv

    def kmv_pairs(spark, sf):
        # KMV pairwise Jaccard/intersection estimates (sketches.py::
        # kmv_pair_jaccard) over per-source 3-shingle sets — the merged-
        # bottom-k set operation HLL cannot express; integer estimator,
        # G² pair work touches k-sized sketches only.  Top-20 most
        # similar source pairs.
        from aiwhispr_spark.operators.sketches import kmv_pair_jaccard

        return kmv_pair_jaccard(_t(spark, sf, "documents")).orderBy(
            F.desc("jaccard_i"), "grp_a", "grp_b"
        ).limit(20)

    q["kmv_jaccard_pairs"] = kmv_pairs

    def wl_hist(spark, sf):
        # 1-WL color refinement (graph.py::wl_color_refinement), 2 rounds
        # over a closed-form directed labeled graph — the RDF canonical-
        # labeling / GNN-expressiveness workhorse.  Histogram of final
        # color classes; equal colors = r-hop-indistinguishable nodes.
        from aiwhispr_spark.operators.graph import wl_color_histogram

        # hub-skewed closed-form graph (50 spokes → 7 quadratic-residue
        # hubs, two predicates): WL refines it into a MIXED histogram —
        # classes of 7/6/3 plus structural singletons — so both over- and
        # under-refinement bugs shift the gate
        d = _t(spark, sf, "documents").filter(F.col("doc_id") < 200)
        triples = d.select(
            F.concat(F.lit("E"), (F.col("doc_id") % 50).cast("string")).alias(
                "subj"
            ),
            F.element_at(
                F.array(F.lit("linked_to"), F.lit("cites")),
                (F.col("doc_id") % 2 + 1).cast("int"),
            ).alias("pred"),
            F.concat(
                F.lit("E"), ((F.col("doc_id") * F.col("doc_id")) % 7).cast("string")
            ).alias("obj"),
        ).distinct()
        return wl_color_histogram(triples, rounds=2).orderBy(
            F.desc("n_nodes"), "wl_color"
        )

    q["kg_wl_colors"] = wl_hist

    _AC_PATTERNS = ["scan", "can", "an", "a a", "table", "stream"]

    def ac_counts(spark, sf):
        # real Aho–Corasick automaton (keywords.py::multi_pattern_counts_ac:
        # goto trie + BFS failure links + flattened output links) counting
        # OVERLAPPING char-level occurrences — patterns share suffixes
        # ('scan'⊃'can'⊃'an') so the failure-link path is load-bearing.
        # Oracle recomputes via brute-force position scan.
        from aiwhispr_spark.operators.keywords import multi_pattern_counts_ac

        return multi_pattern_counts_ac(
            _t(spark, sf, "documents"), _AC_PATTERNS
        ).orderBy("id", "pattern")

    q["ac_multi_pattern_counts"] = ac_counts

    def ac_equals_expr(spark, sf):
        # exactness gate: the automaton path ≡ the per-pattern JVM
        # expression twin on every (id, pattern) — same pattern as
        # ivf_all_probe_equals_exact.  Emits the disagreement count (0)
        # plus both row totals.
        from aiwhispr_spark.operators.keywords import (
            multi_pattern_counts_ac,
            multi_pattern_counts_expr,
        )

        d = _t(spark, sf, "documents")
        ac = multi_pattern_counts_ac(d, _AC_PATTERNS)
        ex = multi_pattern_counts_expr(d, _AC_PATTERNS)
        joined = ac.alias("ac").join(
            ex.alias("ex"), ["id", "pattern"], "full_outer"
        )
        return joined.agg(
            F.sum(
                (
                    F.coalesce(F.col("ac.n_hits"), F.lit(-1))
                    != F.coalesce(F.col("ex.n_hits"), F.lit(-2))
                ).cast("long")
            ).alias("n_disagree"),
            F.count(F.lit(1)).cast("long").alias("n_rows"),
        )

    q["ac_equals_expr_twin"] = ac_equals_expr

    def sp_segment(spark, sf):
        # SentencePiece-style unigram-LM Viterbi segmentation (textstats.
        # py::unigram_viterbi_segment) over the DISTINCT corpus words —
        # the DP state is ONE sortable string (cost|n|path) and the
        # transition plain min(), so the oracle's unrolled string-min DP
        # provably picks the SAME segmentation (output gate, not just
        # cost).
        from aiwhispr_spark.operators.textstats import unigram_viterbi_segment

        words = (
            _t(spark, sf, "documents")
            .select(
                F.explode(
                    F.split(F.lower(F.col("text")), r"\s+")
                ).alias("word")
            )
            .filter(F.col("word") != "")
        )
        return unigram_viterbi_segment(words, _SP_VOCAB).orderBy("word")

    q["unigram_viterbi_segment"] = sp_segment

    def date_norm(spark, sf):
        # multi-format date normalization (literals.py::
        # extract_normalize_dates): separator-keyed day/month convention,
        # month names, REAL Gregorian validation (leap centuries) —
        # synthesized date sentences cycle all 5 formats × years
        # 1996-2004 × days 1-31, so invalid combos (Feb 30, Apr 31,
        # Feb 29 off-leap) appear and must flag valid_i=0.
        from aiwhispr_spark.operators.literals import extract_normalize_dates

        d = _t(spark, sf, "documents").select("doc_id")
        y = (1996 + F.col("doc_id") % 9).cast("int")
        m = (1 + F.col("doc_id") % 12).cast("int")
        dy = (1 + (F.col("doc_id") * 7) % 31).cast("int")
        mon = F.element_at(
            F.array(*[F.lit(x) for x in [
                "January", "February", "March", "April", "May", "June",
                "July", "August", "September", "October", "November",
                "December"]]),
            m,
        )
        ys, ms, ds = y.cast("string"), m.cast("string"), dy.cast("string")
        raw = (
            F.when(F.col("doc_id") % 5 == 0, F.concat(
                F.lpad(ys, 4, "0"), F.lit("-"), F.lpad(ms, 2, "0"),
                F.lit("-"), F.lpad(ds, 2, "0")))
            .when(F.col("doc_id") % 5 == 1, F.concat(ms, F.lit("/"), ds, F.lit("/"), ys))
            .when(F.col("doc_id") % 5 == 2, F.concat(ds, F.lit("."), ms, F.lit("."), ys))
            .when(F.col("doc_id") % 5 == 3, F.concat(mon, F.lit(" "), ds, F.lit(", "), ys))
            .otherwise(F.concat(ds, F.lit(" "), mon, F.lit(" "), ys))
        )
        docs = d.select(
            "doc_id",
            F.concat(F.lit("released on "), raw, F.lit(" and archived.")).alias(
                "text"
            ),
        )
        return extract_normalize_dates(docs).orderBy("id", "raw")

    q["date_normalize_validate"] = date_norm

    def edgecut(spark, sf):
        # partition-layout planning (linkgraph.py::partition_edgecut_eval):
        # hash-by-host vs domain-locality placement over the host graph —
        # the locality-vs-balance trade a distributed graph job tunes
        # before shuffling 100 TB; cut share and balance as integer bp.
        from aiwhispr_spark.operators.linkgraph import (
            extract_links,
            host_edges,
            partition_edgecut_eval,
        )

        docs = spark.read.parquet(_ensure_link_corpus())
        return partition_edgecut_eval(host_edges(extract_links(docs))).orderBy(
            "scheme"
        )

    q["partition_edgecut_eval"] = edgecut

    def landmarks(spark, sf):
        # landmark distance sketch (graph.py::landmark_distance_eval):
        # d̂(u,v) = min_l d(u,l)+d(l,v) from TWO multi-source BFS passes
        # (2·L·|V| rows) evaluated against exact bounded distances — the
        # all-pairs substitution for distance queries on web graphs.
        from aiwhispr_spark.operators.graph import landmark_distance_eval
        from aiwhispr_spark.operators.linkgraph import extract_links, host_edges

        docs = spark.read.parquet(_ensure_link_corpus())
        e = host_edges(extract_links(docs)).select(
            F.col("src_host").alias("src"), F.col("dst_host").alias("dst")
        )
        return landmark_distance_eval(e, n_landmarks=4, hops=6).orderBy("u", "v")

    q["landmark_distance_eval"] = landmarks

    def varint(spark, sf):
        # delta+LEB128 posting-list compression (fulltext.py::
        # postings_varint_stats): the full hex encoding is the hash-gated
        # artifact; pytest pins the decoder roundtrip.
        from aiwhispr_spark.operators.fulltext import postings_varint_stats

        return postings_varint_stats(_t(spark, sf, "documents"), top_k=30)

    q["postings_varint"] = varint

    def dirichlet(spark, sf):
        # Dirichlet query-likelihood ranking (fulltext.py::
        # dirichlet_ql_rank, Zhai & Lafferty): absent in-vocab terms
        # contribute smoothing mass; per-(doc,term) scaled-int ln before
        # the integer sum.
        from aiwhispr_spark.operators.fulltext import dirichlet_ql_rank

        return dirichlet_ql_rank(
            _t(spark, sf, "documents"), ["join", "slow", "customer"], mu=2000, k=10
        )

    q["dirichlet_ql_rank"] = dirichlet

    def kg_cliques(spark, sf):
        # 4-clique enumeration (graph_query.py::cliques_k4): triangles
        # extended by a 4th node d>c adjacent to all three — each clique
        # exactly once by canonical order, over the same entity-entity
        # predicates as kg_triangles.
        from aiwhispr_spark.operators.graph_query import cliques_k4

        t = _corpus_triples(spark)
        edges = t.filter(
            F.col("pred").isin("acquired", "owns", "partnered_with")
        ).select("subj", "obj")
        return cliques_k4(edges, "subj", "obj")

    q["kg_cliques_k4"] = kg_cliques

    def mst(spark, sf):
        # Borůvka minimum spanning forest (graph.py::boruvka_mst) over a
        # deterministic connected fixture (40-node ring + chords, distinct
        # md5 weights → unique MST); the DuckDB oracle runs PRIM via a
        # recursive CTE — an independent sequential algorithm agreeing
        # edge-for-edge with the distributed one.
        from aiwhispr_spark.operators.graph import boruvka_mst

        n = 40
        base = spark.range(n)
        ring = base.select(
            F.col("id").alias("i"), ((F.col("id") + 1) % n).alias("j")
        )
        chords = base.select(
            F.col("id").alias("i"), ((F.col("id") * 7 + 3) % n).alias("j")
        )
        raw = ring.unionByName(chords).filter(F.col("i") != F.col("j"))
        e = (
            raw.select(
                F.least("i", "j").alias("a"), F.greatest("i", "j").alias("b")
            )
            .distinct()
            .withColumn(
                "w",
                F.conv(
                    F.substring(
                        F.md5(
                            F.concat_ws(
                                "-",
                                F.col("a").cast("string"),
                                F.col("b").cast("string"),
                            )
                        ),
                        1,
                        12,
                    ),
                    16,
                    10,
                ).cast("long"),
            )
        )
        return boruvka_mst(e)

    q["boruvka_mst_forest"] = mst

    def seqbuckets(spark, sf):
        # power-of-2 sequence-length bucketing (mixing.py::
        # sequence_length_buckets): per-bucket padding-waste accounting,
        # bit-length bucket (no float log2).
        from aiwhispr_spark.operators.mixing import sequence_length_buckets

        return sequence_length_buckets(_t(spark, sf, "documents"), seq_len_cap=4096)

    q["seq_length_buckets"] = seqbuckets

    def doremi(spark, sf):
        # linear Group-DRO / DoReMi-style domain reweighting (mixing.py::
        # excess_loss_domain_weights): unigram-NLL proxy, integer-exact
        # linear update, overflow-safe normalization.
        from aiwhispr_spark.operators.mixing import excess_loss_domain_weights

        return excess_loss_domain_weights(_t(spark, sf, "documents"))

    q["doremi_domain_weights"] = doremi

    def curriculum(spark, sf):
        # shortest-first curriculum with in-tier content-hash shuffle
        # (mixing.py::curriculum_order) — ranked by the scale-safe
        # global_row_number (range exchange + offsets, no global window).
        from aiwhispr_spark.operators.mixing import curriculum_order

        return curriculum_order(_t(spark, sf, "documents"), seq_len_cap=4096)

    q["curriculum_order"] = curriculum

    def bmp(spark, sf):
        # REAL 24bpp BMP decode (multimodal.py::decode_bmp: stride padding,
        # bottom-up rows, BGR order) → integer channel stats; the
        # closed-form fixture makes a stride/row-order bug a value
        # mismatch, not a crash.
        from aiwhispr_spark.operators.multimodal import bmp_stats

        return bmp_stats(spark.read.parquet(_ensure_bmp_corpus()))

    q["bmp_decode_stats"] = bmp

    def tiff(spark, sf):
        # REAL baseline multi-strip TIFF decode (multimodal.py::decode_tiff:
        # IFD inline-vs-offset value slots, strip-table reassembly) →
        # the same integer channel stats as bmp_decode_stats; a strip-order
        # or inline/offset bug is a value mismatch, not a crash.
        from aiwhispr_spark.operators.multimodal import tiff_stats

        return tiff_stats(spark.read.parquet(_ensure_tiff_corpus()))

    q["tiff_decode_stats"] = tiff

    def png(spark, sf):
        # REAL PNG decode (multimodal.py::decode_png: multi-IDAT zlib
        # stream, per-scanline filter byte, Sub/Up/Average/Paeth
        # reconstruction against RECONSTRUCTED neighbors, chunk CRCs) →
        # the same integer channel stats; the fixture cycles all five
        # filters per image so a filter bug is a value mismatch.
        from aiwhispr_spark.operators.multimodal import png_stats

        return png_stats(spark.read.parquet(_ensure_png_corpus()))

    q["png_decode_stats"] = png

    def gif(spark, sf):
        # REAL GIF decode (multimodal.py::decode_gif: true LZW with the
        # growing-width schedule + KwKwK case, sub-block framing,
        # extension skip, 4-pass interlace) → integer channel stats via
        # the closed-form palette.
        from aiwhispr_spark.operators.multimodal import gif_stats

        return gif_stats(spark.read.parquet(_ensure_gif_corpus()))

    q["gif_decode_stats"] = gif

    def trackers(spark, sf):
        # per-page tracker-script signal (linkgraph.py::
        # tracker_script_signals): third-party script hosts + rule-list
        # tracker match, zero-exchange JVM regex plan.
        from aiwhispr_spark.operators.linkgraph import tracker_script_signals

        return tracker_script_signals(spark.read.parquet(_ensure_tracker_corpus()))

    q["tracker_density"] = trackers

    def calibration(spark, sf):
        # reliability bins + ECE of a quality classifier (modeleval.py::
        # calibration_bins): scores/labels are closed-form in doc_id so the
        # oracle re-derives them from arithmetic alone; NULL int columns of
        # the ECE row coalesce to -1 in BOTH engines (NULL-BIGINT
        # stringification differs; semantics stay in the operator).
        from aiwhispr_spark.operators.modeleval import calibration_bins

        d = _t(spark, sf, "documents").select(
            (F.col("doc_id").cast("long") * 2654435761 % 10001).alias("score_i"),
            F.expr(
                "CASE WHEN (doc_id * 1103515245 + 12345) % 10000"
                " < doc_id * 2654435761 % 10001 THEN 1 ELSE 0 END"
            ).alias("label"),
        )
        out = calibration_bins(d, n_bins=10, scale=10000)
        return out.select(
            "bin",
            "n",
            F.coalesce("mean_score_i", F.lit(-1)).alias("mean_score_i"),
            F.coalesce("pos_rate_i", F.lit(-1)).alias("pos_rate_i"),
            "gap_i",
        )

    q["classifier_calibration_bins"] = calibration

    def kfold(spark, sf):
        # group-aware k-fold with snake balancing (sharding.py::
        # grouped_kfold): quadratic-residue grouping mod 41 gives uneven
        # group sizes; rank by (size desc, name) then boustrophedon fold.
        from aiwhispr_spark.operators.sharding import grouped_kfold

        d = _t(spark, sf, "documents").select(
            F.concat(F.lit("h"), (F.col("doc_id") * F.col("doc_id") % 41)).alias(
                "grp"
            )
        )
        return grouped_kfold(d, "grp", k=5)

    q["grouped_kfold_assign"] = kfold

    def click_pbm(spark, sf):
        # position-based click model (modeleval.py::pbm_attractiveness):
        # synthetic impression log closed-form in doc_id (position-biased
        # click rule 90 div pos), exact 1/pos examination mass via the
        # LCM(1..5)=60 integer trick — no EM, no float.
        from aiwhispr_spark.operators.modeleval import pbm_attractiveness

        imp = _t(spark, sf, "documents").select(
            (F.col("doc_id") % 7).alias("query_id"),
            F.expr("(doc_id div 7) % 11").alias("item_id"),
            (F.col("doc_id") % 5 + 1).alias("pos"),
            F.expr(
                "CASE WHEN doc_id * 2654435761 % 100"
                " < 90 div (doc_id % 5 + 1) THEN 1 ELSE 0 END"
            ).alias("clicked"),
        )
        return pbm_attractiveness(imp, max_pos=5)

    q["click_model_pbm"] = click_pbm

    def scaling_fit(spark, sf):
        # per-domain scaling-law OLS (modeleval.py::ols_fit_by): integer
        # (x, y) points with a known planted slope per group; closed-form
        # normal equations on BIGINT sums, scaled div — the Kaplan-style
        # log-log fit with x as the integer exponent.
        from aiwhispr_spark.operators.modeleval import ols_fit_by

        pts = _t(spark, sf, "documents").select(
            F.concat(F.lit("d"), F.col("doc_id") % 5).alias("grp"),
            F.expr("(doc_id div 5) % 20").alias("x"),
            F.expr(
                "40000 - (1000 + 137 * (doc_id % 5)) * ((doc_id div 5) % 20)"
                " + doc_id * 48271 % 500"
            ).alias("y"),
        )
        return ols_fit_by(pts, "grp")

    q["scaling_law_fit"] = scaling_fit

    def rdf_lists(spark, sf):
        # ordered RDF collection reconstruction (rdf.py::rdf_list_unroll):
        # cons-cell chains (rdf:first/rdf:rest) built closed-form in doc_id
        # (list j has j%4+1 items), walked breadth-parallel with the bounded
        # round contract; the oracle derives expected (owner, idx, item)
        # rows from arithmetic alone — independent of the chain walk.
        from aiwhispr_spark.operators.rdf import rdf_list_unroll

        d = (
            _t(spark, sf, "documents")
            .filter(F.col("doc_id") < 30)
            .select(
                F.col("doc_id").alias("j"),
                (F.col("doc_id") % 4 + 1).alias("ln"),
            )
        )
        heads = d.select(
            F.concat(F.lit("owner"), F.col("j")).alias("subj"),
            F.lit("hasList").alias("pred"),
            F.concat(F.lit("b"), F.col("j"), F.lit("_0")).alias("obj"),
        )
        cells = d.select(
            "j", "ln", F.explode(F.sequence(F.lit(0), F.col("ln") - 1)).alias("i")
        )
        cell_id = F.concat(F.lit("b"), F.col("j"), F.lit("_"), F.col("i"))
        firsts = cells.select(
            cell_id.alias("subj"),
            F.lit("rdf:first").alias("pred"),
            F.concat(
                F.lit("item_"), F.col("j"), F.lit("_"), F.col("i")
            ).alias("obj"),
        )
        rests = cells.select(
            cell_id.alias("subj"),
            F.lit("rdf:rest").alias("pred"),
            F.when(
                F.col("i") + 1 < F.col("ln"),
                F.concat(F.lit("b"), F.col("j"), F.lit("_"), F.col("i") + 1),
            )
            .otherwise(F.lit("rdf:nil"))
            .alias("obj"),
        )
        triples = heads.unionByName(firsts).unionByName(rests)
        return rdf_list_unroll(triples, max_len=8)

    q["kg_rdf_lists"] = rdf_lists

    def dawid_skene(spark, sf):
        # one Dawid–Skene EM round (evaluation.py::dawid_skene_one_round):
        # 5 annotators with planted per-annotator noise (annot a flips
        # labels on 2a of 10 items), majority init → integer accuracies →
        # accuracy-weighted re-vote; ds_label flips where noisy annotators
        # formed the majority.
        from aiwhispr_spark.operators.evaluation import dawid_skene_one_round

        lab = (
            _t(spark, sf, "documents")
            .filter(F.col("doc_id") < 60)
            .select(F.col("doc_id").alias("item"))
            .select(
                "item", F.explode(F.sequence(F.lit(0), F.lit(4))).alias("an")
            )
            .select(
                F.col("item").alias("item_id"),
                F.concat(F.lit("a"), F.col("an")).alias("annot_id"),
                F.concat(
                    F.lit("L"),
                    F.expr(
                        "CASE WHEN (item * 7 + an * 13) % 10 < an * 2"
                        " THEN (item % 3 + 1 + an) % 3 ELSE item % 3 END"
                    ),
                ).alias("label"),
            )
        )
        return dawid_skene_one_round(lab)

    q["dawid_skene_round1"] = dawid_skene

    def pivot_daily(spark, sf):
        # relational pivot surface (DataFrame groupBy().pivot() with an
        # explicit value list → deterministic schema): ISO-weekday ×
        # event-type count matrix; absent cells coalesce to 0 to match the
        # oracle's CASE-sum form (pivot-count yields NULL there).
        ev = _t(spark, sf, "events").select(
            F.expr("weekday(ts) + 1").alias("isodow"), "event_type"
        )
        types = ["click", "error", "purchase", "signup", "view"]
        p = ev.groupBy("isodow").pivot("event_type", types).count()
        return p.select(
            "isodow", *[F.coalesce(F.col(t), F.lit(0)).alias(t) for t in types]
        )

    q["events_pivot_daily"] = pivot_daily

    def pq_adc(spark, sf):
        # product-quantization ADC top-k (similarity.py::pq_adc_topk):
        # fixed-point 1e3 integer vectors, codebook = vec_id < 16, query =
        # vec_id 123 kept exact; m=8 subspaces of 8 dims, argmin squared-L2
        # assignment (tie-break smallest code), LUT-summed estimated
        # distance — all-BIGINT so the whole IVF+PQ memory path hash-gates.
        from aiwhispr_spark.operators.similarity import (
            fixed_point_vectors,
            pq_adc_topk,
        )

        fp = fixed_point_vectors(_t(spark, sf, "embeddings"))
        cb = fp.filter(F.col("vec_id") < 16).select(
            F.col("vec_id").cast("long").alias("code"),
            F.col("fp").alias("cfp"),
        )
        qv = fp.filter(F.col("vec_id") == 123)
        return pq_adc_topk(fp, cb, qv, k=10, m=8, dim=64)

    q["pq_adc_topk"] = pq_adc

    def kn_bigram(spark, sf):
        # exact-rational Kneser–Ney bigram model (textstats.py::
        # kneser_ney_bigram_model): d=3/4 multiplies out to one integer
        # fraction over (cab, ca, continuation counts, N) — the
        # continuation-count semantics that raw-frequency LMs miss.
        from aiwhispr_spark.operators.textstats import kneser_ney_bigram_model

        return kneser_ney_bigram_model(
            _t(spark, sf, "documents"), min_count=3
        )

    q["kneser_ney_bigram"] = kn_bigram

    def rouge_pairs(spark, sf):
        # ROUGE-L LCS dedup metric (evaluation.py::rouge_l_pairs): planted
        # LCS — 6 common tokens, pair j reverses a prefix block of size
        # j%5 in the reference, noise tokens unique+disjoint per side so
        # only the planted subsequence can match; LCS = 6 for block ≤ 1
        # else 7−block.  Oracle is closed form, independent of the DP.
        from aiwhispr_spark.operators.evaluation import rouge_l_pairs

        d = (
            _t(spark, sf, "documents")
            .filter(F.col("doc_id") < 40)
            .select(F.col("doc_id").alias("j"), (F.col("doc_id") % 5).alias("h"))
        )
        common = F.transform(
            F.sequence(F.lit(0), F.lit(5)),
            lambda i: F.concat(F.lit("c"), i),
        )
        noise_a = F.transform(
            F.sequence(F.lit(0), F.lit(7)),
            lambda i: F.concat(F.lit("na"), F.col("j"), F.lit("_"), i),
        )
        noise_b = F.transform(
            F.sequence(F.lit(0), F.lit(3)),
            lambda i: F.concat(F.lit("nb"), F.col("j"), F.lit("_"), i),
        )
        common_b = F.concat(
            F.reverse(F.slice(common, F.lit(1), F.col("h"))),
            F.slice(common, F.col("h") + 1, F.lit(6) - F.col("h")),
        )
        cand = F.concat(
            F.flatten(
                F.zip_with(
                    common,
                    F.slice(noise_a, 1, 6),
                    lambda c, n: F.array(c, n),
                )
            ),
            F.slice(noise_a, 7, 2),
        )
        ref = F.concat(
            F.flatten(
                F.zip_with(
                    F.slice(common_b, F.lit(1), F.lit(4)),
                    noise_b,
                    lambda c, n: F.array(c, n),
                )
            ),
            F.slice(common_b, F.lit(5), F.lit(2)),
        )
        pairs = d.select(
            F.col("j").alias("pair_id"),
            cand.alias("cand_toks"),
            ref.alias("ref_toks"),
        )
        return rouge_l_pairs(pairs).select(
            "pair_id", "lcs", "len_cand", "len_ref", "prec_i", "rec_i", "f_i"
        )

    q["rouge_l_dedup_pairs"] = rouge_pairs

    def bleu_stats(spark, sf):
        # BLEU modified n-gram precisions (evaluation.py::bleu_ngram_stats)
        # over real adjacent-document text pairs — the whole metric
        # (tokenize, n-grams, clipped counts) is ONE zero-shuffle JVM
        # projection; the oracle recomputes the clip RELATIONALLY
        # (unnest + count + min-join), so the two derivations are
        # independent.
        from aiwhispr_spark.operators.evaluation import bleu_ngram_stats

        d = _t(spark, sf, "documents").filter(F.col("doc_id") < 40)
        pairs = d.groupBy((F.col("doc_id") / 2).cast("long").alias("pair_id")).agg(
            F.max(F.when(F.col("doc_id") % 2 == 0, F.col("text"))).alias("cand_text"),
            F.max(F.when(F.col("doc_id") % 2 == 1, F.col("text"))).alias("ref_text"),
        )
        return bleu_ngram_stats(pairs).orderBy("pair_id", "n")

    q["bleu_ngram_precisions"] = bleu_stats

    def butterflies(spark, sf):
        # bipartite butterfly counting (linkgraph.py::bipartite_butterflies)
        # over a (key, item) incidence closed-form in doc_id; pair-join
        # C(n_common,2) counting — no 4-node enumeration.  Every key's
        # fan-out here ≤ 9, so the hub cap never fires and the oracle can
        # recompute cap-free.
        from aiwhispr_spark.operators.linkgraph import bipartite_butterflies

        rel = _t(spark, sf, "documents").select(
            F.concat(F.lit("k"), F.col("doc_id") % 13).alias("key"),
            F.concat(F.lit("i"), F.col("doc_id") % 9).alias("item"),
        )
        return bipartite_butterflies(rel)

    q["bipartite_butterflies"] = butterflies

    def ppjoin_pairs(spark, sf):
        # EXACT all-pairs token-Jaccard with prefix filtering (dedup.py::
        # ppjoin_jaccard_pairs, AllPairs/PPJoin): the exactness-preserving
        # near-dup path — unlike the df-capped containment candidates or the
        # probabilistic LSH bands, pruning here loses NOTHING, so the DuckDB
        # oracle is the unpruned full token self-join and any divergence is
        # a bug in the prefix/length filter.  Near-dup pairs are planted
        # closed-form (every doc_id%5==0 doc reappears at +20000 with two
        # appended tokens, J = V/(V+2)).
        from aiwhispr_spark.operators.dedup import ppjoin_jaccard_pairs

        d0 = (
            _t(spark, sf, "documents")
            .filter(F.col("doc_id") < 300)
            .select("doc_id", "text")
        )
        var = d0.filter(F.col("doc_id") % 5 == 0).select(
            (F.col("doc_id") + 20000).alias("doc_id"),
            F.concat(F.col("text"), F.lit(" zq1 zq2")).alias("text"),
        )
        return ppjoin_jaccard_pairs(d0.unionByName(var), threshold=0.8)

    q["ppjoin_jaccard_pairs"] = ppjoin_pairs

    def rake(spark, sf):
        # RAKE keyphrases (keywords.py::rake_keyphrases, Rose et al. 2010):
        # stopword/punct-delimited candidate runs via ONE zero-shuffle JVM
        # fold per doc, deg/freq word scores floored to scaled ints BEFORE
        # the phrase sum (the dirichlet pattern).  Oracle segments the same
        # runs relationally (delimiter running-sum window).
        from aiwhispr_spark.operators.keywords import rake_keyphrases

        return rake_keyphrases(_t(spark, sf, "documents"), top_k=30)

    q["rake_keyphrases"] = rake

    def lexdiv(spark, sf):
        # Lexical-diversity panel (textstats.py::lexical_diversity_panel):
        # TTR, hapax ratio, Yule's K per source — the length-insensitive
        # repetitiveness screen for training mixes; exact cross-multiplied
        # BIGINTs, two map-side-combinable aggregates.
        from aiwhispr_spark.operators.textstats import lexical_diversity_panel

        return lexical_diversity_panel(_t(spark, sf, "documents"))

    q["lexical_diversity_panel"] = lexdiv

    def l_div(spark, sf):
        # l-diversity audit (pii.py::l_diversity_audit, Machanavajjhala):
        # the homogeneity-attack screen k-anonymity misses — distinct-l and
        # entropy-l verdicts per QI class; ONE float ln per (class, value)
        # rounded to a scaled int BEFORE the integer dot product (dirichlet
        # pattern), threshold round(1e6·ln 3) driver-side.
        from aiwhispr_spark.operators.pii import l_diversity_audit

        d = _t(spark, sf, "documents").select(
            "lang", "source", F.expr("n_chars div 100").cast("long").alias("chars_c")
        )
        return l_diversity_audit(d, ["lang", "source"], "chars_c", l=3)

    q["l_diversity_audit"] = l_div

    def benford(spark, sf):
        # Benford first-digit audit (literals.py::benford_first_digit_audit)
        # over order totals in cents: expected log10(1+1/d) proportions as a
        # driver-computed INTEGER LITERAL TABLE (NDCG-discount pattern);
        # all 9 digits visible at zero count.  TPC-H prices are uniform-ish,
        # so the audit REPORTS deviation — the gate pins the arithmetic,
        # not conformance.
        from aiwhispr_spark.operators.literals import benford_first_digit_audit

        o_ = _t(spark, sf, "orders").select(
            F.expr("CAST(round(o_totalprice * 100) AS BIGINT)").alias("cents")
        )
        return benford_first_digit_audit(o_, "cents").orderBy("digit")

    q["benford_quantity_audit"] = benford

    def unit_norm(spark, sf):
        # Exact-rational unit normalization (literals.py::normalize_units):
        # measurements closed-form from doc_id (unit cycles through 8 known
        # + 1 unknown arm), broadcast conversion table, value_i·num div den;
        # unknown units stay visible with the −1 sentinel.
        from aiwhispr_spark.operators.literals import normalize_units

        units = [
            "m", "km", "cm", "mi", "kg", "g", "lb", "oz", "furlong",
        ]
        arr = F.array(*[F.lit(u) for u in units])
        meas = _t(spark, sf, "documents").select(
            F.col("doc_id").alias("meas_id"),
            F.element_at(arr, (F.col("doc_id") % 9 + 1).cast("int")).alias("unit"),
            ((F.col("doc_id") + 1) * 137).cast("long").alias("value_i"),
        )
        return normalize_units(meas)

    q["unit_normalize_quantities"] = unit_norm

    def wordpiece(spark, sf):
        # WordPiece greedy longest-match encoding (textstats.py::
        # wordpiece_encode, the BERT inference rule — distinct from BPE
        # merge replay and unigram Viterbi): distinct words ≤ 10 chars
        # (the oracle's unroll bound) through ONE mapInPandas stage; the
        # oracle replays greedy as 10 unrolled arg_max stages.
        from aiwhispr_spark.operators.textstats import wordpiece_encode

        words = (
            _t(spark, sf, "documents")
            .select(F.explode(F.split(F.lower(F.trim("text")), r"\s+")).alias("word"))
            .filter((F.col("word") != "") & (F.length("word") <= 10))
        )
        return wordpiece_encode(words, _WP_VOCAB).orderBy("word")

    q["wordpiece_encode"] = wordpiece

    def assoc_rules(spark, sf):
        # Apriori 2-itemset association rules (rulemine.py::
        # association_rules_2item): content-word baskets per doc, frequent
        # items pruned BEFORE the per-basket pair fan-out (downward
        # closure = the hub guard); support/confidence/lift as exact
        # cross-multiplied scaled ints.
        from aiwhispr_spark.operators.keywords import kept_tokens_expr
        from aiwhispr_spark.operators.rulemine import association_rules_2item

        items = _t(spark, sf, "documents").select(
            "doc_id", F.explode(kept_tokens_expr(F.col("text"))).alias("item")
        )
        return association_rules_2item(items, "doc_id", "item", min_support=25)

    q["association_rules_2item"] = assoc_rules

    def tpch_q12ish(spark, sf):
        # TPC-H Q12 adaptation (shipping modes / order priority): the
        # schema has no l_shipmode or l_commitdate, so shipmode is
        # synthesized closed-form (l_suppkey%4) and "late" = shipped > 90
        # days after order date — the SHAPE is Q12's: fact-fact join on
        # orderkey + conditional two-tier aggregate.  Counts only (no
        # float anywhere).
        modes = F.array(F.lit("MAIL"), F.lit("SHIP"), F.lit("RAIL"), F.lit("TRUCK"))
        li = _t(spark, sf, "lineitem").select(
            "l_orderkey",
            F.element_at(modes, (F.col("l_suppkey") % 4 + 1).cast("int")).alias(
                "shipmode"
            ),
            "l_shipdate",
        )
        o_ = _t(spark, sf, "orders").select("o_orderkey", "o_orderdate", "o_orderpriority")
        j = li.join(o_, li.l_orderkey == o_.o_orderkey).filter(
            F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS")
        )
        hi = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
        return (
            j.groupBy("shipmode")
            .agg(
                F.sum(F.when(hi, 1).otherwise(0)).cast("long").alias("high_line_count"),
                F.sum(F.when(hi, 0).otherwise(1)).cast("long").alias("low_line_count"),
            )
            .orderBy("shipmode")
        )

    q["tpch_q12_late_priority"] = tpch_q12ish

    def tpch_q13ish(spark, sf):
        # TPC-H Q13 (customer order-count distribution): LEFT join keeps
        # zero-order customers (count(o_orderkey) counts matches, not
        # rows), '5-LOW' plays the excluded-comment role; two-level
        # aggregate — per-customer then histogram.
        c = _t(spark, sf, "customer").select("c_custkey")
        o_ = _t(spark, sf, "orders").filter(
            F.col("o_orderpriority") != "5-LOW"
        ).select("o_custkey", "o_orderkey")
        per = (
            c.join(o_, c.c_custkey == o_.o_custkey, "left")
            .groupBy("c_custkey")
            .agg(F.count("o_orderkey").cast("long").alias("c_count"))
        )
        return (
            per.groupBy("c_count")
            .agg(F.count(F.lit(1)).cast("long").alias("custdist"))
            .orderBy(F.desc("custdist"), F.desc("c_count"))
        )

    q["tpch_q13_order_distribution"] = tpch_q13ish

    def tpch_q19ish(spark, sf):
        # TPC-H Q19 (disjunctive brand/size/quantity predicates): revenue
        # under an OR-of-ANDs filter — the predicate-pushdown stressor;
        # part dim broadcast, per-row cents before the integer sum (the
        # tpch_q5 ROUND-SUM rule).
        p = _t(spark, sf, "part").select("p_partkey", "p_brand", "p_size")
        li = _t(spark, sf, "lineitem").select(
            "l_partkey", "l_quantity", "l_extendedprice", "l_discount"
        )
        j = li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        arm1 = (
            (F.col("p_brand") == "Brand#1")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(1, 20)
        )
        arm2 = (
            (F.col("p_brand") == "Brand#3")
            & F.col("p_size").between(10, 30)
            & F.col("l_quantity").between(10, 40)
        )
        arm3 = (
            (F.col("p_brand") == "Brand#5")
            & F.col("p_size").between(20, 50)
            & F.col("l_quantity").between(20, 50)
        )
        cents = F.round(
            F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100
        ).cast("long")
        return j.filter(arm1 | arm2 | arm3).agg(
            F.sum(cents).cast("long").alias("revenue_ci"),
            F.count(F.lit(1)).cast("long").alias("n_lines"),
        )

    q["tpch_q19_disjunctive_revenue"] = tpch_q19ish

    def tpch_q22ish(spark, sf):
        # TPC-H Q22 (global-average subquery + anti join): customers above
        # the positive-balance floor-div average (integer cents — float
        # avg is summation-order dependent) in selected "country codes"
        # (c_nationkey%7 stands in for the phone prefix) with NO orders
        # (left_anti; "no order since 2001" — every custkey has SOME
        # order in this data, so recency makes the anti-join bite).  The
        # scalar average broadcasts as a literal aggregate — no collect.
        c = _t(spark, sf, "customer").select(
            "c_custkey",
            (F.col("c_nationkey") % 7).cast("long").alias("cntrycode"),
            F.round(F.col("c_acctbal") * 100).cast("long").alias("bal_ci"),
        ).filter(F.col("cntrycode").isin(1, 2, 4))
        avg_pos = c.filter(F.col("bal_ci") > 0).agg(
            F.expr("CAST(sum(bal_ci) div count(1) AS BIGINT)").alias("avg_ci")
        )
        o_ = (
            _t(spark, sf, "orders")
            .filter(F.col("o_orderdate") >= "2001-01-01")
            .select(F.col("o_custkey").alias("c_custkey"))
            .distinct()
        )
        rich = (
            c.crossJoin(F.broadcast(avg_pos))
            .filter(F.col("bal_ci") > F.col("avg_ci"))
            .join(o_, "c_custkey", "left_anti")
        )
        return (
            rich.groupBy("cntrycode")
            .agg(
                F.count(F.lit(1)).cast("long").alias("numcust"),
                F.sum("bal_ci").cast("long").alias("totacctbal_ci"),
            )
            .orderBy("cntrycode")
        )

    q["tpch_q22_global_sales_opportunity"] = tpch_q22ish

    def tpch_q7ish(spark, sf):
        # TPC-H Q7 (volume shipping): revenue flowing between one nation
        # PAIR in both directions, per ship year.  Plan shape: nation is
        # joined TWICE (supplier side + customer side) — both broadcast;
        # the disjunctive pair predicate rides the joined frame, NOT a
        # union of two branches (the session-2 fan-out trap); lineitem ⋈
        # orders is the only big shuffle.  NATION_3/NATION_8 both have
        # suppliers at every sf tier (sf0.001 has only 10 suppliers).
        n = _t(spark, sf, "nation")
        s = _t(spark, sf, "supplier").join(
            F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey")
        ).select("s_suppkey", F.col("n_name").alias("supp_nation"))
        c = _t(spark, sf, "customer").join(
            F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey")
        ).select("c_custkey", F.col("n_name").alias("cust_nation"))
        li = _t(spark, sf, "lineitem").filter(
            (F.col("l_shipdate") >= "1996-01-01")
            & (F.col("l_shipdate") < "1998-01-01")
        )
        o = _t(spark, sf, "orders").select("o_orderkey", "o_custkey")
        j = (
            li.join(o, li.l_orderkey == o.o_orderkey)
            .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
            .join(c, o.o_custkey == c.c_custkey)
            .filter(
                (
                    (F.col("supp_nation") == "NATION_3")
                    & (F.col("cust_nation") == "NATION_8")
                )
                | (
                    (F.col("supp_nation") == "NATION_8")
                    & (F.col("cust_nation") == "NATION_3")
                )
            )
        )
        return (
            j.groupBy(
                "supp_nation",
                "cust_nation",
                F.year("l_shipdate").cast("long").alias("l_year"),
            )
            .agg(
                F.sum(
                    F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100)
                    .cast("long")
                )
                .cast("long")
                .alias("revenue_ci")
            )
            .orderBy("supp_nation", "cust_nation", "l_year")
        )

    q["tpch_q7_volume_shipping"] = tpch_q7ish

    def tpch_q8ish(spark, sf):
        # TPC-H Q8 (national market share): NATION_3's share of ECONOMY-part
        # revenue sold to EUROPE customers, per order year.  ONE aggregation
        # with a conditional sum — not two branches joined (the share and
        # the total come from the same scan); the ratio is an integer
        # basis-point division (div ≡ DuckDB //, both truncate toward zero)
        # so no float reaches the output.  All dims broadcast; the only
        # big shuffle is lineitem ⋈ orders.
        n = _t(spark, sf, "nation")
        r = _t(spark, sf, "region").filter(F.col("r_name") == "EUROPE")
        cust_dim = (
            _t(spark, sf, "customer")
            .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
            .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
            .select("c_custkey")
        )
        supp_dim = (
            _t(spark, sf, "supplier")
            .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
            .select("s_suppkey", F.col("n_name").alias("supp_nation"))
        )
        p = _t(spark, sf, "part").filter(F.col("p_type") == "ECONOMY").select(
            "p_partkey"
        )
        o = _t(spark, sf, "orders").filter(
            (F.col("o_orderdate") >= "1996-01-01")
            & (F.col("o_orderdate") < "1998-01-01")
        )
        li = _t(spark, sf, "lineitem")
        cents = F.round(
            F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100
        ).cast("long")
        j = (
            li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
            .join(o, li.l_orderkey == o.o_orderkey)
            .join(cust_dim, o.o_custkey == cust_dim.c_custkey)
            .join(F.broadcast(supp_dim), li.l_suppkey == supp_dim.s_suppkey)
            .select(
                F.year("o_orderdate").cast("long").alias("o_year"),
                cents.alias("cents"),
                F.col("supp_nation"),
            )
        )
        agg = j.groupBy("o_year").agg(
            F.sum(
                F.when(F.col("supp_nation") == "NATION_3", F.col("cents")).otherwise(
                    F.lit(0)
                )
            )
            .cast("long")
            .alias("nation_ci"),
            F.sum("cents").cast("long").alias("total_ci"),
        )
        # total_ci = 0 would NULL the div (→ float64 on the driver's pandas
        # path, the r4 red-row class) — coalesce to the -1 sentinel in BOTH
        # engines per the gate discipline
        return agg.select(
            "o_year",
            "nation_ci",
            "total_ci",
            F.expr(
                "CAST(coalesce((nation_ci * 10000) div total_ci, -1) AS BIGINT)"
            ).alias("mkt_share_bp"),
        ).orderBy("o_year")

    q["tpch_q8_market_share"] = tpch_q8ish

    def tpch_q11ish(spark, sf):
        # TPC-H Q11 (important stock), adapted to this schema (no partsupp):
        # per-part shipped value from EUROPE-region suppliers, keeping parts
        # whose value exceeds 1.5x the MEAN part value.  The original's
        # fixed fraction is sf-dependent (0 rows past sf0.001); the mean-
        # relative threshold is scale-free.  The global scalar (count, sum)
        # is a 1-row broadcast — the HAVING-against-global-aggregate plan
        # shape — compared in exact integers (value*2*n > 3*total).
        sup = _esup_europe(spark, sf).select("s_suppkey")
        li = _t(spark, sf, "lineitem")
        val = (
            li.join(F.broadcast(sup), li.l_suppkey == sup.s_suppkey)
            .groupBy(F.col("l_partkey").alias("p_partkey"))
            .agg(
                F.sum(
                    F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100)
                    .cast("long")
                )
                .cast("long")
                .alias("value_ci")
            )
        )
        tot = val.agg(
            F.count(F.lit(1)).cast("long").alias("n_parts"),
            F.sum("value_ci").cast("long").alias("total_ci"),
        )
        return (
            val.crossJoin(F.broadcast(tot))
            .filter(F.col("value_ci") * F.col("n_parts") * 2 > 3 * F.col("total_ci"))
            .select("p_partkey", "value_ci")
            .orderBy(F.desc("value_ci"), "p_partkey")
        )

    q["tpch_q11_important_value"] = tpch_q11ish

    def tpch_q15ish(spark, sf):
        # TPC-H Q15 (top supplier): quarterly revenue per supplier, keep the
        # max-revenue supplier(s).  The max is a 1-row aggregate broadcast
        # and joined on EQUALITY (ties all surface, as in the spec) — not a
        # collect, not a global window.  The supplier dim broadcasts.
        li = _t(spark, sf, "lineitem").filter(
            (F.col("l_shipdate") >= "1997-01-01")
            & (F.col("l_shipdate") < "1997-04-01")
        )
        rev = li.groupBy(F.col("l_suppkey").alias("s_suppkey")).agg(
            F.sum(
                F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100)
                .cast("long")
            )
            .cast("long")
            .alias("total_rev_ci")
        )
        mx = rev.agg(F.max("total_rev_ci").alias("_mx"))
        s = _t(spark, sf, "supplier").select("s_suppkey", "s_name")
        return (
            rev.crossJoin(F.broadcast(mx))
            .filter(F.col("total_rev_ci") == F.col("_mx"))
            .join(F.broadcast(s), "s_suppkey")
            .select("s_suppkey", "s_name", "total_rev_ci")
            .orderBy("s_suppkey")
        )

    q["tpch_q15_top_supplier"] = tpch_q15ish

    def tpch_q16ish(spark, sf):
        # TPC-H Q16 (part/supplier relationship): distinct-supplier counts
        # per surviving (brand, type, size) bucket.  The part filter pushes
        # to the scan (plan-gated family); count(DISTINCT) is a two-phase
        # exact aggregate — no sketch needed at this cardinality (the
        # KMV/HLL tier is the approximate twin when 100 TB makes exact
        # distinct too hot).
        p = _t(spark, sf, "part").filter(
            (F.col("p_brand") != "Brand#1")
            & (F.col("p_type") != "PROMO")
            & (F.col("p_size").isin(1, 2, 3, 4, 5, 6, 7, 8))
        )
        li = _t(spark, sf, "lineitem").select("l_partkey", "l_suppkey")
        return (
            li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
            .groupBy("p_brand", "p_type", F.col("p_size").cast("long").alias("p_size"))
            .agg(F.countDistinct("l_suppkey").cast("long").alias("supplier_cnt"))
            .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type", "p_size")
        )

    q["tpch_q16_supplier_part_cnt"] = tpch_q16ish

    def tpch_q17ish(spark, sf):
        # TPC-H Q17 (small-quantity revenue): lines of Brand#3 parts whose
        # quantity is below HALF the part's average quantity.  The
        # correlated AVG becomes a per-part aggregate joined back to the
        # SAME brand-restricted line set; the comparison is cross-
        # multiplied integers (2*qty*cnt < sumq) — quantities are integral
        # doubles, so no float threshold exists in either engine.  Output
        # is the spec's avg-yearly figure as an integer cents div 7.
        p = _t(spark, sf, "part").filter(F.col("p_brand") == "Brand#3").select(
            "p_partkey"
        )
        pl = (
            _t(spark, sf, "lineitem")
            .join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
            .select(
                "l_partkey",
                F.col("l_quantity").cast("long").alias("qty"),
                F.round(F.col("l_extendedprice") * 100).cast("long").alias("cents"),
            )
        )
        pa = pl.groupBy("l_partkey").agg(
            F.count(F.lit(1)).cast("long").alias("cnt"),
            F.sum("qty").cast("long").alias("sumq"),
        )
        small = pl.join(pa, "l_partkey").filter(
            2 * F.col("qty") * F.col("cnt") < F.col("sumq")
        )
        return small.agg(
            F.expr("CAST(coalesce(sum(cents), 0) div 7 AS BIGINT)").alias(
                "avg_yearly_ci"
            ),
            F.count(F.lit(1)).cast("long").alias("n_lines"),
        )

    q["tpch_q17_small_qty_revenue"] = tpch_q17ish

    def tpch_q21ish(spark, sf):
        # TPC-H Q21 (suppliers who kept orders waiting), adapted: "late" is
        # shipped >60 days after the order date (no receipt/commit dates in
        # this schema).  The EXISTS becomes a LEFT SEMI against OTHER
        # suppliers' lines on the order, the NOT EXISTS a LEFT ANTI against
        # OTHER suppliers' LATE lines — both probe-side joins that never
        # fan out l1, the classic multi-self-join shape.  numwait counts l1
        # rows (the spec's semantics), not distinct orders.
        o = _t(spark, sf, "orders").select(
            "o_orderkey", "o_orderstatus", "o_orderdate"
        )
        li = _t(spark, sf, "lineitem").select(
            "l_orderkey", "l_suppkey", "l_shipdate"
        )
        late = (
            li.join(o, li.l_orderkey == o.o_orderkey)
            .filter(
                (F.col("o_orderstatus") == "F")
                & (F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"))
            )
            .select("l_orderkey", "l_suppkey")
        )
        others = li.select(
            F.col("l_orderkey").alias("o2_orderkey"),
            F.col("l_suppkey").alias("o2_suppkey"),
        )
        with_other = late.join(
            others,
            (F.col("l_orderkey") == F.col("o2_orderkey"))
            & (F.col("l_suppkey") != F.col("o2_suppkey")),
            "left_semi",
        )
        other_late = late.select(
            F.col("l_orderkey").alias("o3_orderkey"),
            F.col("l_suppkey").alias("o3_suppkey"),
        )
        waiting = with_other.join(
            other_late,
            (F.col("l_orderkey") == F.col("o3_orderkey"))
            & (F.col("l_suppkey") != F.col("o3_suppkey")),
            "left_anti",
        )
        s = _t(spark, sf, "supplier").select("s_suppkey", "s_name")
        return (
            waiting.join(F.broadcast(s), waiting.l_suppkey == s.s_suppkey)
            .groupBy("s_name")
            .agg(F.count(F.lit(1)).cast("long").alias("numwait"))
            .orderBy(F.desc("numwait"), "s_name")
            .limit(20)
        )

    q["tpch_q21_waiting_supplier"] = tpch_q21ish

    def bitext_mine(spark, sf):
        # Margin-based bitext mining (similarity.py::bitext_margin_mine,
        # Artetxe & Schwenk ACL'19 / CCMatrix): mutual margin-best pairs
        # across the even/odd vec_id arms with ratio-margin >= 1.0.  All
        # arithmetic is fixed-point BIGINT (normalized vectors at 1e4, one
        # integer div) — hash-gateable end to end.  The cross-join is the
        # gate tier; production feeds ANN candidates (see docstring).
        from aiwhispr_spark.operators.similarity import bitext_margin_mine

        return bitext_margin_mine(_t(spark, sf, "embeddings"))

    q["bitext_margin_mine"] = bitext_mine

    def tpch_q2ish(spark, sf):
        # TPC-H Q2 (minimum-cost supplier), adapted to this schema (no
        # partsupp): a EUROPE supplier's "offer" for a part is their MIN
        # line price (cents) over history; for SMALL parts of size <= 10,
        # keep the offer(s) matching the per-part minimum — the correlated
        # MIN becomes a per-part aggregate joined back on equality, ties
        # all surface (the spec's semantics).  Part + supplier dims
        # broadcast; the only big shuffle is the (part, supplier) offer agg.
        esup = _esup_europe(spark, sf)
        p = _t(spark, sf, "part").filter(
            (F.col("p_type") == "SMALL") & (F.col("p_size") <= 10)
        ).select("p_partkey")
        offers = (
            _t(spark, sf, "lineitem")
            .join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
            .join(
                F.broadcast(esup.select("s_suppkey")),
                F.col("l_suppkey") == F.col("s_suppkey"),
            )
            .groupBy("p_partkey", "l_suppkey")
            .agg(
                F.min(F.round(F.col("l_extendedprice") * 100).cast("long"))
                .cast("long")
                .alias("offer_ci")
            )
        )
        pm = offers.groupBy("p_partkey").agg(F.min("offer_ci").alias("_min_ci"))
        return (
            offers.join(pm, "p_partkey")
            .filter(F.col("offer_ci") == F.col("_min_ci"))
            .join(F.broadcast(esup), offers.l_suppkey == esup.s_suppkey)
            .select("acctbal_ci", "s_name", "n_name", "p_partkey", "offer_ci")
            .orderBy(F.desc("acctbal_ci"), "s_name", "p_partkey")
            .limit(100)
        )

    q["tpch_q2_min_cost_supplier"] = tpch_q2ish

    def tpch_q9ish(spark, sf):
        # TPC-H Q9 (product-type profit), adapted: profit on 'widget' parts
        # per supplier nation per order year; supply cost stands in as half
        # the part's retail price (schema lacks ps_supplycost).  BOTH money
        # terms round per-row BEFORE the sum (the tpch_q5 ROUND-SUM rule);
        # part/supplier dims broadcast; lineitem ⋈ orders is the only big
        # shuffle.
        p = _t(spark, sf, "part").filter(F.col("p_name").contains("widget")).select(
            "p_partkey",
            F.round(F.col("p_retailprice") * 50).cast("long").alias("half_retail_ci"),
        )
        sup = (
            _t(spark, sf, "supplier")
            .join(
                F.broadcast(_t(spark, sf, "nation")),
                F.col("s_nationkey") == F.col("n_nationkey"),
            )
            .select("s_suppkey", F.col("n_name").alias("nation"))
        )
        o = _t(spark, sf, "orders").select("o_orderkey", "o_orderdate")
        li = _t(spark, sf, "lineitem")
        amount = (
            F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100)
            .cast("long")
            - F.col("l_quantity").cast("long") * F.col("half_retail_ci")
        )
        j = (
            li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
            .join(F.broadcast(sup), li.l_suppkey == sup.s_suppkey)
            .join(o, li.l_orderkey == o.o_orderkey)
        )
        return (
            j.groupBy(
                "nation", F.year("o_orderdate").cast("long").alias("o_year")
            )
            .agg(F.sum(amount).cast("long").alias("profit_ci"))
            .orderBy("nation", F.desc("o_year"))
        )

    q["tpch_q9_product_profit"] = tpch_q9ish

    def tpch_q20ish(spark, sf):
        # TPC-H Q20 (potential part promotion), adapted: EUROPE suppliers
        # who shipped a MAJORITY (2*qty > part total) of some 'red' part's
        # 1997 volume.  The availqty>half-shipped EXISTS becomes: per-
        # (part, supplier) 1997 quantity vs per-part total (integer cross-
        # multiply), then a left_semi from suppliers into the qualifying
        # set — supplier rows never fan out.
        li97 = _t(spark, sf, "lineitem").filter(
            (F.col("l_shipdate") >= "1997-01-01")
            & (F.col("l_shipdate") < "1998-01-01")
        )
        red = _t(spark, sf, "part").filter(F.col("p_name").startswith("red ")).select(
            "p_partkey"
        )
        # persisted: both the share filter and the per-part total consume
        # this tiny (part, supplier) aggregate — unpersisted, the lineitem
        # scan + agg would re-execute in the total's branch (ReuseExchange
        # does not fire across the differing downstream subtrees)
        sp = (
            li97.join(F.broadcast(red), F.col("l_partkey") == F.col("p_partkey"))
            .groupBy("l_partkey", "l_suppkey")
            .agg(F.sum(F.col("l_quantity").cast("long")).cast("long").alias("sp_qty"))
            .persist()
        )
        tot = sp.groupBy("l_partkey").agg(
            F.sum("sp_qty").cast("long").alias("total_qty")
        )
        qual = (
            sp.join(tot, "l_partkey")
            .filter(2 * F.col("sp_qty") > F.col("total_qty"))
            .select(F.col("l_suppkey").alias("qual_suppkey"))
            .distinct()
        )
        esup = _esup_europe(spark, sf).select("s_suppkey", "s_name")
        return (
            esup.join(
                qual, esup.s_suppkey == qual.qual_suppkey, "left_semi"
            )
            .select("s_suppkey", "s_name")
            .orderBy("s_suppkey")
        )

    q["tpch_q20_part_promotion"] = tpch_q20ish

    def gini_sources(spark, sf):
        # Lorenz curve + Gini coefficient of per-source character mass —
        # the concentration diagnostic a mixing plan reads before choosing
        # temperature/water-fill rates (a Gini near 1 means a handful of
        # sources dominate the corpus and uniform sampling starves the
        # tail).  ALL integer arithmetic: sources ranked (mass asc, name),
        # Gini = (2*sum(i*x_i) - (n+1)*tot) / (n*tot) as one BIGINT
        # cross-multiplied div; cumulative shares are integer basis
        # points.  One aggregate + one n-sources-sized window — the fact
        # scan never re-sorts.
        d = _t(spark, sf, "documents")
        mass = d.groupBy("source").agg(
            F.sum(F.coalesce(F.col("n_chars"), F.lit(0)).cast("long"))
            .cast("long")
            .alias("mass")
        )
        from pyspark.sql.window import Window as W

        # NULL source sorts FIRST (Spark's asc default) — the oracle pins
        # the same NULLS FIRST explicitly; persisted because the tot
        # branch and the output branch both consume this frame (the fact
        # scan would otherwise re-execute per branch)
        w = W.orderBy(F.col("mass").asc(), F.col("source").asc_nulls_first())
        ranked = mass.select(
            "source",
            "mass",
            F.row_number().over(w).alias("rnk"),
            F.sum("mass").over(w.rowsBetween(W.unboundedPreceding, 0)).alias("cum"),
        ).persist()
        tot = ranked.agg(
            F.count(F.lit(1)).cast("long").alias("n_src"),
            F.sum("mass").cast("long").alias("tot_mass"),
            F.sum(F.col("rnk") * F.col("mass")).cast("long").alias("weighted"),
        )
        return (
            ranked.crossJoin(F.broadcast(tot))
            .select(
                F.col("rnk").cast("long").alias("rnk"),
                "source",
                "mass",
                # greatest(.,1) keeps an all-zero-mass corpus at 0 instead
                # of a NULL (driver float64) or an ANSI divide-by-zero
                F.expr("(10000 * cum) div greatest(tot_mass, 1)").alias(
                    "cum_share_bp"
                ),
                F.expr(
                    "(10000 * (2 * weighted - (n_src + 1) * tot_mass))"
                    " div greatest(n_src * tot_mass, 1)"
                ).alias("gini_bp"),
            )
            .orderBy("rnk")
        )

    q["gini_source_concentration"] = gini_sources

    def wilson_rank(spark, sf):
        # Wilson-score lower-bound ranking (the confidence-adjusted
        # fraction that keeps a 1/1 conversion from outranking 80/100 —
        # the standard small-sample fix for quality/CTR ranking): per-user
        # purchase rate over view+purchase events at z=1.96.  The bound is
        # computed in DOUBLE with the formula text IDENTICAL in both
        # engines (sqrt is IEEE correctly-rounded, so same input bits →
        # same output bits), then floored to micro-units — the dirichlet
        # double-pipeline discipline.  One conditional-sum aggregate.
        ev = _t(spark, sf, "events").filter(
            F.col("event_type").isin("view", "purchase")
        )
        agg = ev.groupBy("user_id").agg(
            F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0))
            .cast("long")
            .alias("pos"),
            F.count(F.lit(1)).cast("long").alias("n"),
        )
        lb = (
            "(CAST(pos AS DOUBLE) + 1.9208 - 1.96 * sqrt((CAST(pos AS DOUBLE)"
            " * CAST(n - pos AS DOUBLE)) / CAST(n AS DOUBLE) + 0.9604))"
            " / (CAST(n AS DOUBLE) + 3.8416)"
        )
        return (
            agg.select(
                "user_id",
                "pos",
                "n",
                F.expr(f"CAST(floor(1000000 * ({lb})) AS BIGINT)").alias(
                    "wilson_lb_u"
                ),
            )
            .orderBy(F.desc("wilson_lb_u"), "user_id")
            .limit(20)
        )

    q["wilson_conversion_rank"] = wilson_rank

    def burrows_delta(spark, sf):
        # Burrows' Delta stylometric attribution (the standard authorship-
        # similarity measure): function-word rates per mille -> per-word
        # corpus z-scores -> Delta(q, d) = SUM of |z_q - z_d| over the
        # surviving word set (vstats filters words GLOBALLY, so every pair
        # sums the same words and sum-ranking == mean-ranking; the
        # conventional mean is delta_u / n_words); smallest Delta = most
        # stylistically similar.  Exactness discipline: rates are integer
        # per-mille (floor div), the variance numerator n*Q - S^2 is an
        # EXACT BIGINT — worst-case bound: rate <= 1000 so n*Q <= n^2*1e6,
        # int64-safe to ~3e6 docs (realistic fw rates <= ~100/1000 buy
        # ~100x more); past that, rescale rates or bucket the corpus —
        # Spark would wrap silently while DuckDB errors (the chi2 lesson).
        # Each |z_i - z_j| term FLOORS to micro-units BEFORE the
        # cross-word sum (the BM25 per-term rule — a float sum over words
        # would be summation-order dependent), and sqrt of identical
        # BIGINT-origin doubles is IEEE-identical.  Zero-variance words
        # carry no style signal and drop in BOTH engines; token-less docs
        # never reach the spine (they produce no token rows).  ONE token
        # explode -> ONE groupBy with conditional sums, melted over the
        # 10-word stack; pairs are (3 queries x corpus).
        FW = ["the", "of", "and", "to", "a", "in", "is", "that", "it", "as"]
        d = _t(spark, sf, "documents")
        toks = d.select(
            "doc_id",
            F.explode(
                F.split(F.lower(F.coalesce(F.col("text"), F.lit(""))), "[^a-z]+")
            ).alias("tok"),
        ).filter(F.col("tok") != "")
        aggs = toks.groupBy("doc_id").agg(
            F.count(F.lit(1)).cast("long").alias("n_tok"),
            *[
                F.sum(F.when(F.col("tok") == w, 1).otherwise(0))
                .cast("long")
                .alias(f"_c{i}")
                for i, w in enumerate(FW)
            ],
        )
        stack = ", ".join(f"'{w}', _c{i}" for i, w in enumerate(FW))
        rates = (
            aggs.select(
                "doc_id",
                "n_tok",
                F.expr(f"stack({len(FW)}, {stack}) AS (word, cnt)"),
            )
            .select(
                "doc_id",
                "word",
                F.expr("(1000 * cnt) div n_tok").alias("rate"),
            )
        ).persist()
        stats = rates.groupBy("word").agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("rate").cast("long").alias("s"),
            F.sum(F.col("rate") * F.col("rate")).cast("long").alias("q"),
        )
        vstats = stats.select(
            "word", "n", (F.col("n") * F.col("q") - F.col("s") * F.col("s")).alias("vnum")
        ).filter(F.col("vnum") > 0)
        qr = rates.filter(F.col("doc_id") < 3).select(
            F.col("doc_id").alias("qid"), "word", F.col("rate").alias("qrate")
        )
        pairs = qr.join(rates, "word").filter(F.col("qid") != F.col("doc_id")).select(
            "qid",
            F.col("doc_id").alias("oid"),
            "word",
            F.abs(F.col("qrate") - F.col("rate")).alias("diff"),
        )
        terms = pairs.join(F.broadcast(vstats), "word").select(
            "qid",
            "oid",
            F.expr(
                "CAST(floor(1000000 * (CAST(diff AS DOUBLE) * CAST(n AS DOUBLE)"
                " / sqrt(CAST(vnum AS DOUBLE)))) AS BIGINT)"
            ).alias("term_u"),
        )
        delta = terms.groupBy("qid", "oid").agg(
            F.sum("term_u").cast("long").alias("delta_u")
        )
        w = Window.partitionBy("qid").orderBy("delta_u", "oid")
        return (
            delta.withColumn("r", F.row_number().over(w))
            .filter(F.col("r") <= 5)
            .select("qid", "oid", "delta_u")
            .orderBy("qid", "delta_u", "oid")
        )

    q["burrows_delta_attribution"] = burrows_delta

    def ppr_push(spark, sf):
        # Local PPR by synchronous residual push (graph_query.py::
        # ppr_push_bounded, Andersen–Chung–Lang): frontier-sized work per
        # round, exact BIGINT mass conservation (floor remainders stay in
        # the residual), bounded rounds = exact-state contract.  Distinct
        # from the power-iteration trustrank: push never ranks the whole
        # graph.  Oracle: the same arithmetic unrolled (_ppr_push_sql).
        from aiwhispr_spark.operators.graph_query import ppr_push_bounded

        return ppr_push_bounded(
            _host_graph_edges_df(spark), seed=_TRUST_SEED_HOSTS[0], rounds=4
        ).orderBy("node")

    q["ppr_push_local"] = ppr_push

    def hard_negatives(spark, sf):
        # DPR-style hard-negative mining (fulltext.py::mine_hard_negatives):
        # per training query, the top BM25-ranked docs that are NOT gold —
        # gold pairs closed-form (doc_id%7==0 docs assigned to q{id%3+1});
        # global per-token df shared across queries; per-qid top-5 window.
        from aiwhispr_spark.operators.fulltext import (
            build_inverted_index,
            mine_hard_negatives,
            tokenize,
        )

        d = _t(spark, sf, "documents")
        idx = build_inverted_index(d, "text", "doc_id")
        dl = d.select(
            F.col("doc_id").alias("id"),
            F.size(F.filter(tokenize(F.col("text")), lambda t: t != ""))
            .cast("double")
            .alias("dl"),
        )
        qt = {"q1": ["data", "fast"], "q2": ["query", "slow"], "q3": ["merge", "stream"]}
        pos = d.filter(F.col("doc_id") % 7 == 0).select(
            F.concat(F.lit("q"), (F.col("doc_id") % 3 + 1).cast("string")).alias("qid"),
            F.col("doc_id").alias("id"),
        )
        return mine_hard_negatives(idx, dl, qt, pos, n_neg=5)

    q["hard_negative_mining"] = hard_negatives

    def ams_f2(spark, sf):
        # AMS F2 sketch (sketches.py::ams_f2_sketch): 8 one-counter ±1-sign
        # estimators of Σf², md5-nibble signs; exact F2 rides alongside
        # (the probe-all≡exact gate pattern — pytest pins the estimator
        # mean's accuracy, the oracle hashes the full per-estimator state).
        from aiwhispr_spark.operators.sketches import ams_f2_sketch

        toks = _t(spark, sf, "documents").select(
            F.explode(
                F.filter(
                    F.split(F.lower(F.trim("text")), r"\s+"), lambda x: x != F.lit("")
                )
            ).alias("tok")
        )
        return ams_f2_sketch(toks, "tok", n_estimators=8)

    q["ams_f2_sketch"] = ams_f2

    def gorilla(spark, sf):
        # Gorilla delta-of-delta timestamp encoding cost (layout.py::
        # gorilla_timestamp_bits): per-user event streams, the VLDB'15 bit
        # schedule; series-partitioned window (never global), exact BIGINT.
        from aiwhispr_spark.operators.layout import gorilla_timestamp_bits

        return gorilla_timestamp_bits(_t(spark, sf, "events"), "user_id", "ts")

    q["timeseries_gorilla_bits"] = gorilla

    def periodicity(spark, sf):
        # KMP smallest-period detection (textstats.py::string_periodicity):
        # long-unit template spam the token-level repetition signals miss;
        # O(n) failure function in mapInPandas, quadratic border twin in the
        # oracle; doc_id%5==0 docs replaced by an exact 20-char×10 stamp.
        from aiwhispr_spark.operators.textstats import string_periodicity

        d = _t(spark, sf, "documents").select(
            "doc_id",
            F.when(
                F.col("doc_id") % 5 == 0,
                F.repeat(F.substring("text", 1, 20), 10),
            )
            .otherwise(F.col("text"))
            .alias("text"),
        )
        return string_periodicity(d, "text", "doc_id", max_chars=200).orderBy("id")

    q["string_periodicity"] = periodicity

    def revalidation(spark, sf):
        # HTTP cache revalidation planner (robots.py::revalidation_plan,
        # RFC 7234-lite): fresh / heuristic-fresh / If-None-Match /
        # If-Modified-Since / refetch over a closed-form crawl-state table;
        # pure JVM CASE chain, all-BIGINT epoch math, −1 lifetime sentinel.
        from aiwhispr_spark.operators.robots import revalidation_plan

        st = _t(spark, sf, "documents").select(
            F.concat(F.lit("u"), F.col("doc_id").cast("string")).alias("url"),
            (F.lit(1700000000) + (F.col("doc_id") % 400) * 10000)
            .cast("long")
            .alias("fetched_ep"),
            F.when(
                F.col("doc_id") % 3 == 0,
                F.concat(F.lit('W/"e'), F.col("doc_id").cast("string"), F.lit('"')),
            ).alias("etag"),
            F.when(
                F.col("doc_id") % 2 == 0,
                (F.lit(1700000000) + (F.col("doc_id") % 400) * 10000)
                - (F.col("doc_id") + 1) * 20000,
            )
            .cast("long")
            .alias("lm_ep"),
            F.when(F.col("doc_id") % 5 == 0, (F.col("doc_id") % 48) * 90000)
            .cast("long")
            .alias("max_age_s"),
        )
        return revalidation_plan(st, now_ep=1704067200)

    q["http_revalidation_plan"] = revalidation

    def autocomplete(spark, sf):
        # Typeahead completions (fulltext.py::autocomplete_prefix_topk):
        # vocab-first collapse, prefix explode off vocab rows, per-prefix
        # top-3 window (WindowGroupLimit) — the corpus never reaches the
        # window.
        from aiwhispr_spark.operators.fulltext import autocomplete_prefix_topk

        return autocomplete_prefix_topk(_t(spark, sf, "documents"), k=3)

    q["autocomplete_prefix_topk"] = autocomplete

    def matryoshka(spark, sf):
        # Matryoshka truncation eval (similarity.py::matryoshka_overlap_
        # eval): overlap@10 of 16/32-dim prefix retrieval vs the full 64 —
        # exact BIGINT dots via fixed_point_vectors; the full-dim row is
        # the k self-gate.  Brute-force eval harness by contract.
        from aiwhispr_spark.operators.similarity import matryoshka_overlap_eval

        return matryoshka_overlap_eval(_t(spark, sf, "embeddings"))

    q["matryoshka_overlap_eval"] = matryoshka

    def complex_score(spark, sf):
        # ComplEx scoring (kgscore.py::complex_scores, Trouillon 2016) over
        # the kg_transe_score triple base — the conjugate fixes DistMult's
        # symmetry collapse on directional relations (asymmetry pinned);
        # pure JVM integer expression, zero shuffle.
        from aiwhispr_spark.operators.kgscore import complex_scores

        d = _t(spark, sf, "documents")
        triples = d.select(
            F.concat(F.lit("Entity_"), (F.col("doc_id") % 40).cast("string")).alias(
                "subj"
            ),
            F.element_at(
                F.array(F.lit("founded"), F.lit("acquired"), F.lit("based_in")),
                (F.col("doc_id") % 3 + 1).cast("int"),
            ).alias("pred"),
            F.concat(
                F.lit("Entity_"), ((F.col("doc_id") * 7 + 1) % 40).cast("string")
            ).alias("obj"),
        ).distinct()
        return complex_scores(triples, dim=16)

    q["kg_complex_score"] = complex_score

    def apportion(spark, sf):
        # Hamilton largest-remainder budget apportionment (mixing.py::
        # apportion_largest_remainder): 1000 sample slots across sources by
        # total chars — Σ alloc = budget EXACTLY (no float quota drift);
        # remainder window is source-cardinality-sized (grouped_kfold
        # discipline).
        from aiwhispr_spark.operators.mixing import apportion_largest_remainder

        w = (
            _t(spark, sf, "documents")
            .groupBy(F.col("source").alias("src"))
            .agg(F.sum("n_chars").cast("long").alias("chars"))
        )
        return apportion_largest_remainder(w, "src", "chars", budget=1000)

    q["sample_budget_apportionment"] = apportion

    def set_cover(spark, sf):
        # Greedy weighted set cover (mixing.py::greedy_source_cover): which
        # 4 part brands maximize type#size coverage (25 brands × 299 items,
        # best single brand covers 83 — all 4 rounds do real work, unlike a
        # vocabulary incidence where source 1 covers everything) —
        # declarative winner-as-1-row-frame rounds, no driver collect;
        # oracle unrolls the same 4 rounds.
        from aiwhispr_spark.operators.mixing import greedy_source_cover

        inc = _t(spark, sf, "part").select(
            F.col("p_brand").alias("source"),
            F.concat_ws("#", F.col("p_type"), F.col("p_size")).alias("item"),
        )
        return greedy_source_cover(inc, "source", "item", k=4)

    q["greedy_source_cover"] = set_cover

    def densest(spark, sf):
        # Batched densest-subgraph peeling (graph_query.py::densest_
        # subgraph_peel, Charikar via Bahmani batching): O(log n) rounds,
        # cross-multiplied integer threshold, densest snapshot flagged.
        # Fixture = planted 8-clique core + 20-ring + 30 leaves hanging off
        # one core node: round 1 peels leaves+ring, round 2 isolates the
        # clique (the BEST snapshot — best ≠ round 1 exercises the flag),
        # round 3 peels the regular remainder to empty (visible fixpoint
        # rows).  The near-regular host graph peels to empty in ONE round
        # (avg-degree rule), which gates nothing.
        from aiwhispr_spark.operators.graph_query import densest_subgraph_peel

        d = _t(spark, sf, "documents").select("doc_id")
        core = d.select((F.col("doc_id") % 8).alias("v")).distinct()
        clique = (
            core.alias("x")
            .crossJoin(core.alias("y"))
            .filter(F.col("x.v") < F.col("y.v"))
            .select(
                F.concat(F.lit("c"), F.col("x.v").cast("string")).alias("src"),
                F.concat(F.lit("c"), F.col("y.v").cast("string")).alias("dst"),
            )
        )
        ring = d.filter(F.col("doc_id") < 20).select(
            F.concat(F.lit("r"), F.col("doc_id").cast("string")).alias("src"),
            F.concat(F.lit("r"), ((F.col("doc_id") + 1) % 20).cast("string")).alias(
                "dst"
            ),
        )
        leaves = d.filter(F.col("doc_id") < 30).select(
            F.concat(F.lit("l"), F.col("doc_id").cast("string")).alias("src"),
            F.lit("c0").alias("dst"),
        )
        edges = clique.unionByName(ring).unionByName(leaves)
        return densest_subgraph_peel(edges, rounds=5).orderBy("round")

    q["densest_subgraph_peel"] = densest

    def chi2_features(spark, sf):
        # χ² feature selection (evaluation.py::chi2_feature_selection,
        # Manning IR 13.5.2): 2×2 presence/label cells per token, exact
        # cross-multiplied BIGINT statistic, zero-margin guard; top-30 by
        # (chi2 desc, item).
        from aiwhispr_spark.operators.evaluation import chi2_feature_selection
        from aiwhispr_spark.operators.keywords import kept_tokens_expr

        d = _t(spark, sf, "documents").select(
            F.col("doc_id").alias("id"),
            (F.col("doc_id") % 3 == 0).cast("int").alias("lbl"),
            F.explode(kept_tokens_expr(F.col("text"))).alias("item"),
        )
        return chi2_feature_selection(d, "lbl", "item", top_k=30)

    q["chi2_feature_selection"] = chi2_features

    def mcnemar(spark, sf):
        # McNemar continuity-corrected paired test (evaluation.py::
        # mcnemar_paired_test): disagreement-cell χ² for two systems on
        # the same items; one scalar map-side-combinable aggregate.
        from aiwhispr_spark.operators.evaluation import mcnemar_paired_test

        d = _t(spark, sf, "documents").select(
            (F.col("doc_id") % 2 == 0).cast("int").alias("sys_a"),
            (F.col("doc_id") % 3 != 0).cast("int").alias("sys_b"),
        )
        return mcnemar_paired_test(d, "sys_a", "sys_b")

    q["mcnemar_paired_test"] = mcnemar

    def measurements(spark, sf):
        # Composed extraction→canonicalization gate: prose measurement
        # mentions (literals.py::extract_measurements, longer-units-first
        # alternation — regex | is first-match) through the exact-rational
        # normalize_units; furlong docs match nothing (absent by design —
        # the unknown-unit sentinel is unit_normalize_quantities' gate),
        # the decoy clause never parses.
        from aiwhispr_spark.operators.literals import (
            extract_measurements,
            normalize_units,
        )

        units = F.array(
            *[F.lit(u) for u in ["m", "km", "cm", "mi", "kg", "g", "lb", "oz", "furlong"]]
        )
        src = _t(spark, sf, "documents").select(
            "doc_id",
            F.concat(
                F.lit("Item"), F.col("doc_id").cast("string"),
                F.lit(" weighs "), (F.col("doc_id") + 1).cast("string"),
                F.lit("."), (F.col("doc_id") % 10).cast("string"), F.lit(" "),
                F.element_at(units, (F.col("doc_id") % 9 + 1).cast("int")),
                F.lit(" per the spec. Decoy weighs fast units."),
            ).alias("text"),
        )
        return normalize_units(extract_measurements(src))

    q["measurement_facts_normalized"] = measurements

    def mutual_nn(spark, sf):
        # Reciprocal-nearest-neighbor pairs (similarity.py::
        # mutual_topk_pairs, k=2): the mutual filter over integer-dot kNN —
        # high-precision alignment/dedup candidates; all-pairs is the eval
        # harness, production verifies LSH/IVF candidates.
        from aiwhispr_spark.operators.similarity import mutual_topk_pairs

        emb = _t(spark, sf, "embeddings").filter(F.col("vec_id") < 120)
        return mutual_topk_pairs(emb, k=2)

    q["mutual_nn_pairs"] = mutual_nn

    def skyline(spark, sf):
        # Pareto skyline (ranking.py::skyline_pareto, Börzsönyi 2001):
        # non-dominated docs on 3 integer criteria — the multi-objective
        # selection no weighted score expresses; dominance anti-join,
        # all-ties kept.
        from aiwhispr_spark.operators.ranking import skyline_pareto

        d = _t(spark, sf, "documents").select(
            F.col("doc_id").alias("id"),
            F.col("n_chars").cast("long").alias("len_score"),
            (F.col("doc_id") % 97).cast("long").alias("fresh_score"),
            ((F.col("doc_id") * 3) % 89).cast("long").alias("link_score"),
        )
        return skyline_pareto(d, ["len_score", "fresh_score", "link_score"])

    q["skyline_pareto_docs"] = skyline

    def lt_cascade(spark, sf):
        # Deterministic linear-threshold cascade (graph_query.py::
        # lt_cascade_bounded, θ=1/3): influence spread from 6 seeds along
        # the closed-form weighted graph; exact cross-multiplied
        # activation, bounded rounds, unreached nodes absent by design.
        from aiwhispr_spark.operators.graph_query import lt_cascade_bounded

        edges = _t(spark, sf, "documents").select(
            F.concat(F.lit("n"), (F.col("doc_id") % 40).cast("string")).alias("src"),
            F.concat(
                F.lit("n"), ((F.col("doc_id") * 7 + 1) % 40).cast("string")
            ).alias("dst"),
            (F.col("doc_id") % 5 + 1).cast("long").alias("w"),
        )
        return lt_cascade_bounded(
            edges, [f"n{i}" for i in range(6)], rounds=4, theta_num=1, theta_den=3
        ).orderBy("activated_round", "node")

    q["lt_cascade_influence"] = lt_cascade

    def ring_assign(spark, sf):
        # Consistent-hash ring (sharding.py::consistent_hash_assign, Karger
        # vnodes=8) vs the SAME ring minus shard s3 — `moved_i` materializes
        # the selling point (only s3's arcs remap; rendezvous is the sibling
        # scheme).  Ring = driver-side literal CASE chain, zero joins.
        from aiwhispr_spark.operators.sharding import consistent_hash_assign

        shards = ["s1", "s2", "s3", "s4"]
        src = _t(spark, sf, "documents").select(
            F.concat(F.lit("https://h"), (F.col("doc_id") % 37).cast("string"),
                     F.lit(".example.com/p/"), F.col("doc_id").cast("string")).alias("url")
        )
        full = consistent_hash_assign(src, shards, "url", out_col="shard_full")
        both = consistent_hash_assign(
            full, [s_ for s_ in shards if s_ != "s3"], "url", out_col="shard_wo_s3"
        )
        return both.select(
            "url",
            "shard_full",
            "shard_wo_s3",
            (F.col("shard_full") != F.col("shard_wo_s3")).cast("long").alias("moved_i"),
        )

    q["consistent_hash_ring"] = ring_assign

    def knapsack(spark, sf):
        # Fractional-knapsack budget allocation (mixing.py::
        # fractional_knapsack): hosts priced by fetch cost, funded by
        # value density until the budget boundary (pro-rata at the
        # boundary); floored-density sort key shared by both engines;
        # zero-cost hosts visible with the −1 sentinel.
        from aiwhispr_spark.operators.mixing import fractional_knapsack

        hosts = (
            _t(spark, sf, "documents")
            .groupBy(F.concat(F.lit("h"), (F.col("doc_id") % 30).cast("string")).alias("host"))
            .agg(
                F.sum("n_chars").cast("long").alias("value"),
                (F.count(F.lit(1)) * 3 + F.min(F.col("doc_id") % 7)).cast("long").alias("cost"),
            )
        )
        return fractional_knapsack(hosts, "host", "value", "cost", budget=800)

    q["knapsack_crawl_budget"] = knapsack

    def politeness_sched(spark, sf):
        # Politeness fetch-time assignment (robots.py::politeness_schedule):
        # the sequential t_i = max(a_i, t_{i-1}+d) queue unrolled to ONE
        # host-partitioned running max (closed form in the docstring);
        # exact integer epochs, wait_s ≥ 0 by construction.
        from aiwhispr_spark.operators.robots import politeness_schedule

        d = _t(spark, sf, "documents").select("doc_id")
        host = F.concat(F.lit("h"), (F.col("doc_id") % 5).cast("string"))
        frontier = d.select(
            host.alias("host"),
            F.concat(F.lit("u"), F.col("doc_id").cast("string")).alias("url"),
            (F.lit(1700000000) + (F.col("doc_id") * 13) % 900).cast("long").alias(
                "arrival_ep"
            ),
        )
        return politeness_schedule(frontier, delay_s=7)

    q["politeness_fetch_schedule"] = politeness_sched

    def ef_postings(spark, sf):
        # Elias–Fano posting sizes (fulltext.py::elias_fano_postings_stats,
        # Vigna quasi-succinct): low-bit width and total bits from exact
        # bit-length arithmetic — the varint twin's modern sibling.
        from aiwhispr_spark.operators.fulltext import elias_fano_postings_stats

        return elias_fano_postings_stats(_t(spark, sf, "documents"), top_k=30)

    q["elias_fano_postings"] = ef_postings

    def seq_patterns(spark, sf):
        # 2-step sequential patterns (temporal.py::sequential_pattern_
        # support): a-before-b user counts from (user, type) min/max
        # summaries — subsequence semantics (the Markov surface gates
        # adjacency); events never pairwise-scanned.
        from aiwhispr_spark.operators.temporal import sequential_pattern_support

        return sequential_pattern_support(_t(spark, sf, "events"), min_support=5)

    q["sequential_pattern_support"] = seq_patterns

    def vocab_drift(spark, sf):
        # Cross-epoch vocabulary drift (textstats.py::vocabulary_drift_jsd):
        # exact JSD between even/odd-doc token distributions — one ln per
        # token-side on the cross-multiplied rational (dirichlet pattern),
        # absent tokens unsmoothed (exact ln2-bounded divergence).
        from aiwhispr_spark.operators.textstats import vocabulary_drift_jsd

        d = _t(spark, sf, "documents")
        return vocabulary_drift_jsd(
            d.filter(F.col("doc_id") % 2 == 0), d.filter(F.col("doc_id") % 2 == 1)
        )

    q["vocabulary_drift_jsd"] = vocab_drift

    # The driver's CORRECTNESS gate checks the FIRST 50 registered queries, so
    # composition / scale-path / novel-operator oracles are promoted to the
    # front and trivial kernel wrappers (plus the three documented rows-only
    # queries, which get only a weak rows-check anyway) demoted to the back.
    # Names absent from q (e.g. during partial test monkeypatching) are skipped.
    first = QUERY_RISK_ORDER
    # Explicit demotions: every entry needs a reason string; the
    # placement pytest (tests/test_query_placement.py) fails any
    # registered query that is in NEITHER `first` NOR this dict, so a
    # new query cannot silently land outside the driver's risk ordering.
    last = list(QUERY_DEMOTIONS)
    ordered = [k for k in first if k in q]
    placed = set(ordered) | set(last)
    ordered += [k for k in q if k not in placed]
    ordered += [k for k in last if k in q]
    assert set(ordered) == set(q), "query reorder dropped or invented names"
    return {k: q[k] for k in ordered}


# --- oracle SQL -----------------------------------------------------------------------


def oracle_sql() -> dict[str, str]:
    o: dict[str, str] = {}
    o["flagship_semantic_search"] = FLAGSHIP_SQL

    o["t1_clean_html"] = (
        f"SELECT doc_id, regexp_replace({HTML_WRAP_SQL}, '{CLEANR_PATTERN}', '', 'g') "
        "AS cleaned FROM documents"
    )
    o["t4_clean_se"] = (
        "SELECT doc_id, regexp_replace('<p>' || text || ' p&gt; /p&gt; &lt;pre&gt; end</p>', "
        f"'{CLEANR_SE_PATTERN}', '', 'g') AS cleaned FROM documents"
    )
    # T2: blocks = whole <code>…</code> spans run through the T1 regex
    o["t2_codeblocks"] = f"""
        WITH src AS (SELECT doc_id, {CODE_WRAP_SQL} AS h FROM documents),
        blocks AS (
          SELECT doc_id, unnest(regexp_extract_all(h, '(?s)<code>.*?</code>')) AS raw,
                 generate_subscripts(regexp_extract_all(h, '(?s)<code>.*?</code>'), 1) - 1 AS block_no
          FROM src
        )
        SELECT doc_id, block_no,
               regexp_replace(raw, '{CLEANR_PATTERN}', '', 'g') AS codeblock
        FROM blocks
    """
    # T3: n=2 sequential first-match replacements — DuckDB regexp_replace
    # without 'g' replaces only the first occurrence, mirroring the loop
    o["t3_replace_codeblocks"] = f"""
        SELECT doc_id,
               regexp_replace(
                 regexp_replace({CODE_WRAP_SQL}, '(?s)<code>.*?</code>', '[#CODEBLOCK][0]'),
                 '(?s)<code>.*?</code>', '[#CODEBLOCK][1]') AS replaced
        FROM documents
    """
    # T9: inputs use a controlled charset (alnum + space + '?'), so the
    # quote_plus/quote calls reduce to fixed replacements
    o["t9_display_url"] = """
        SELECT doc_id,
               replace('http://site ' || source, ' ', '+') || '/'
                 || replace(replace('page dir/' || doc_id || ' x?.txt', ' ', '%20'), '?', '%3F') AS url_http,
               '/mnt/data ' || source || '/page dir/' || doc_id || ' x?.txt' AS url_plain
        FROM documents
    """
    o["t5_language_validate"] = _t5_sql()
    o["t7_strip_punct"] = f"""
        SELECT doc_id,
               array_to_string(
                 list_transform(regexp_split_to_array(trim(text || '{PUNCT_SUFFIX.replace("'", "''")}'), '\\s+'),
                                w -> {_punct_strip_sql("w")}),
                 ' ') AS stripped
        FROM documents
    """
    o["t8_truncate"] = """
        SELECT doc_id,
               CASE WHEN length(text || text || text) > 500
                    THEN substr(text || text || text, 1, 497) || '...'
                    ELSE text || text || text END AS display
        FROM documents
    """
    o["f5_meta_projection"] = """
        SELECT doc_id, source, n_chars, length(text) AS text_len,
               regexp_replace(source, '^src', 'site_') AS site
        FROM documents WHERE n_chars > 0
    """
    o["f1_do_not_read"] = """
        SELECT doc_id FROM documents
        WHERE source NOT IN ('src3', 'src7')
          AND NOT regexp_matches(text, 'window window window')
    """
    o["f7_resume_anti_join"] = """
        SELECT doc_id FROM documents d
        WHERE NOT EXISTS (SELECT 1 FROM events e WHERE e.user_id = d.doc_id)
    """
    o["f8_site_filter"] = (
        "SELECT event_id, user_id FROM events WHERE event_type = 'click'"
    )
    o["f2_suffix_filter"] = (
        "SELECT p_partkey, p_type FROM part WHERE p_type IN ('ECONOMY', 'PROMO')"
    )
    o["f6_xml_attr_projection"] = """
        WITH src AS (
          SELECT '<row Id="' || o_orderkey || '" Pri="' || o_orderpriority
                 || '" Ts="1995-03-15T10:30:00.000"/>' AS xml
          FROM orders
        )
        SELECT CAST(regexp_extract(xml, 'Id="([^"]*)"', 1) AS INT) AS id_attr,
               regexp_extract(xml, 'Pri="([^"]*)"', 1) AS pri_attr,
               CAST(epoch(strptime(regexp_extract(xml, 'Ts="([^"]*)"', 1),
                                   '%Y-%m-%dT%H:%M:%S.%g')) AS BIGINT) AS ts_epoch
        FROM src
    """
    o["g2_coalesce_json"] = """
        SELECT event_id,
               CAST(coalesce(nullif(json_extract_string(props, '$.k'), '0'), '-1') AS INT) AS k_final
        FROM events
    """
    o["u5_doc_dispatch"] = f"""
        WITH routed AS (
          SELECT doc_id, text,
                 ['txt','html','pdf','docx','xlsx','pptx'][CAST(doc_id % 6 AS INT) + 1] AS suffix
          FROM documents
        )
        SELECT doc_id, suffix,
               CASE WHEN suffix = 'txt' THEN text
                    WHEN suffix = 'html' THEN regexp_replace({HTML_WRAP_SQL}, '{CLEANR_PATTERN}', '', 'g')
                    WHEN suffix = 'pdf' THEN '[PDF]' || substr(text, 1, 40)
                    -- docx/xlsx/pptx: payload is an OOXML zip OF the text,
                    -- so a correct extractor round-trips it exactly; the
                    -- builder strips XML-1.0-INVALID control chars (the only
                    -- unrepresentable bytes — CR survives via &#13;), so the
                    -- oracle mirrors the strip for cross-sf robustness
                    ELSE regexp_replace(text, '[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F]', '', 'g')
                    END AS extracted
        FROM routed
    """
    o["g1_qa_assembly"] = """
        SELECT o.o_orderkey AS post_id,
               '[QUESTION]' || o.o_orderpriority || coalesce(a.answers, '') AS post_body_for_llm
        FROM orders o
        LEFT JOIN (
          SELECT l_orderkey,
                 string_agg('[ANSWER]' || l_returnflag || l_linestatus, ''
                            ORDER BY l_linenumber, l_returnflag || l_linestatus) AS answers
          FROM lineitem GROUP BY l_orderkey
        ) a ON a.l_orderkey = o.o_orderkey
    """
    o["g3_reassembly"] = """
        SELECT user_id, string_agg(event_type, '' ORDER BY ts, event_id) AS doc
        FROM events GROUP BY user_id
    """
    o["g4_hit_counts"] = "SELECT event_type, count(*) AS n FROM events GROUP BY event_type"
    o["g5_round_robin"] = """
        SELECT doc_id, CAST((row_number() OVER (ORDER BY doc_id) - 1) % 8 AS INT) AS worker
        FROM documents
    """
    o["q5_point_lookup"] = (
        "SELECT vec_id, label, CAST(len(embedding) AS INT) AS dim FROM embeddings WHERE vec_id = 123"
    )
    o["q4_text_match"] = """
        SELECT source, count(*) AS n_match FROM documents
        WHERE text LIKE '%vector%' GROUP BY source
    """
    o["q4_fulltext_rank"] = """
        WITH toks AS (
          SELECT doc_id, unnest(regexp_split_to_array(lower(trim(text)), '\\s+')) AS token
          FROM documents
        ),
        scored AS (
          SELECT doc_id, CAST(count(*) AS BIGINT) AS score,
                 CAST(count(DISTINCT token) AS INT) AS n_terms
          FROM toks WHERE token IN ('data', 'query', 'fast') GROUP BY doc_id
        )
        SELECT doc_id, score, n_terms FROM scored ORDER BY score DESC, doc_id LIMIT 20
    """
    o["q4_fuzzy_match"] = """
        WITH toks AS (
          SELECT doc_id, unnest(regexp_split_to_array(lower(trim(text)), '\\s+')) AS token
          FROM documents
        ),
        postings AS (
          SELECT doc_id AS id, token, count(*) AS tf
          FROM toks WHERE token <> '' GROUP BY doc_id, token
        ),
        vocab AS (SELECT DISTINCT token FROM postings),
        q AS (SELECT unnest(['dta', 'fasst', 'querry']) AS term),
        matched AS (
          SELECT v.token, q.term FROM vocab v, q
          WHERE abs(length(v.token) - length(q.term)) <= 2
            AND levenshtein(v.token, q.term) <= 2
        ),
        scored AS (
          SELECT id, CAST(sum(tf) AS BIGINT) AS score,
                 CAST(count(DISTINCT term) AS INT) AS n_terms
          FROM postings p JOIN matched m ON p.token = m.token GROUP BY id
        )
        SELECT id AS doc_id, score, n_terms FROM scored
        ORDER BY score DESC, doc_id LIMIT 20
    """
    o["hybrid_search_two_arm"] = """
        WITH q AS (SELECT embedding e FROM embeddings WHERE vec_id = 0),
        sem_scored AS (
          SELECT CAST(vec_id AS BIGINT) AS id,
                 CAST(round(10000 * list_dot_product(embedding::DOUBLE[], (SELECT e FROM q)::DOUBLE[])
                   / (sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]))
                      * sqrt(list_dot_product((SELECT e FROM q)::DOUBLE[], (SELECT e FROM q)::DOUBLE[])))) AS BIGINT) AS score_i
          FROM embeddings
        ),
        sem_top AS (SELECT * FROM sem_scored ORDER BY score_i DESC, id LIMIT 25),
        sem_ranked AS (
          SELECT 'semantic' AS result_type, id, score_i,
                 CAST(row_number() OVER (ORDER BY score_i DESC, id) AS INT) AS rank
          FROM sem_top
        ),
        sem_found AS (SELECT CAST(count(*) AS BIGINT) AS found FROM sem_scored),
        toks AS (
          SELECT doc_id, unnest(regexp_split_to_array(lower(trim(text)), '\\s+')) AS token
          FROM documents
        ),
        txt_scored AS (
          SELECT CAST(doc_id AS BIGINT) AS id, CAST(count(*) AS BIGINT) AS score
          FROM toks WHERE token IN ('data', 'query', 'fast') GROUP BY doc_id
        ),
        txt_top AS (
          SELECT id, CAST(score * 10000 AS BIGINT) AS score_i
          FROM txt_scored ORDER BY score DESC, id LIMIT 20
        ),
        txt_ranked AS (
          SELECT 'text' AS result_type, id, score_i,
                 CAST(row_number() OVER (ORDER BY score_i DESC, id) AS INT) AS rank
          FROM txt_top
        ),
        txt_found AS (SELECT CAST(count(*) AS BIGINT) AS found FROM txt_scored)
        SELECT r.result_type, r.id, r.score_i, r.rank, f.found
        FROM sem_ranked r, sem_found f
        UNION ALL
        SELECT r.result_type, r.id, r.score_i, r.rank, f.found
        FROM txt_ranked r, txt_found f
    """
    o["fulltext_multifield_rank"] = """
        WITH base AS (
          SELECT doc_id, text,
                 substr(text, 1, 30) AS title,
                 source || '/' || doc_id || '.txt' AS content_path
          FROM documents
        ),
        fields AS (
          -- field tag carried explicitly: n_fields counts distinct FIELDS,
          -- which only coincides with distinct weights while weights happen
          -- to be unique (r3 self-review finding)
          SELECT doc_id, 'text' AS field, 1.0 AS w, text  AS val FROM base
          UNION ALL SELECT doc_id, 'title', 3.0, title FROM base
          UNION ALL SELECT doc_id, 'content_path', 5.0, content_path FROM base
        ),
        toks AS (
          SELECT doc_id, field, w,
                 unnest(regexp_split_to_array(lower(trim(val)), '\\s+')) AS token
          FROM fields
        ),
        hits AS (
          SELECT doc_id, field, w, token FROM toks
          WHERE token IN ('batch', 'spark', 'src3/3.txt')
        )
        SELECT doc_id,
               CAST(round(10000 * sum(w)) AS BIGINT) AS score_i,
               CAST(count(DISTINCT token) AS INT) AS n_terms,
               CAST(count(DISTINCT field) AS INT) AS n_fields
        FROM hits GROUP BY doc_id
        ORDER BY score_i DESC, doc_id LIMIT 30
    """
    o["kg_pagerank"] = _pagerank_sql(iterations=5, damping=0.85)
    o["kg_bgp_chain"] = f"""
        WITH t AS ({_kg_e2e_sql()})
        SELECT DISTINCT w.subj AS x, w.obj AS p, b.obj AS city, a.subj AS y
        FROM t w
        JOIN t b ON b.pred = 'based_in' AND b.subj = w.subj
        JOIN t a ON a.pred = 'acquired' AND a.obj = w.subj
        WHERE w.pred = 'works_for'
    """
    o["kg_bgp_minus"] = f"""
        WITH t AS MATERIALIZED ({_kg_e2e_sql()})
        SELECT DISTINCT a.obj AS x, a.subj AS y
        FROM t a
        WHERE a.pred = 'acquired'
          AND NOT EXISTS (
            SELECT 1 FROM t b WHERE b.pred = 'based_in' AND b.subj = a.obj)
          AND NOT EXISTS (
            SELECT 1 FROM t f WHERE f.pred = 'founded_by' AND f.subj = a.obj)
    """
    o["kg_dated_facts"] = """
        SELECT 'u' || doc_id AS url,
               'Entity_' || (doc_id % 37) AS subj,
               'acquired' AS pred,
               'E' || (doc_id % 11) || ' Corp' AS obj,
               'in' AS qualifier,
               CAST(1980 + doc_id % 40 AS INT) AS year
        FROM documents
        UNION ALL
        SELECT 'u' || doc_id,
               'Entity_' || (doc_id % 37),
               'based_in',
               'City' || ((doc_id * 3) % 13),
               'since',
               CAST(1990 + doc_id % 30 AS INT)
        FROM documents
    """
    o["kg_facts_as_of_2000"] = """
        SELECT 'u' || doc_id AS url,
               'Entity_' || (doc_id % 37) AS subj,
               'acquired' AS pred,
               'E' || (doc_id % 11) || ' Corp' AS obj,
               'in' AS qualifier,
               CAST(1980 + doc_id % 40 AS INT) AS year
        FROM documents WHERE 1980 + doc_id % 40 = 2000
        UNION ALL
        SELECT 'u' || doc_id,
               'Entity_' || (doc_id % 37),
               'based_in',
               'City' || ((doc_id * 3) % 13),
               'since',
               CAST(1990 + doc_id % 30 AS INT)
        FROM documents WHERE 1990 + doc_id % 30 <= 2000
    """
    o["minhash_blocking_eval"] = f"""
        WITH {_minhash_cte(max_doc=150)},
        allp AS (
          SELECT la.id AS a, lb.id AS b,
                 len(list_intersect(la.sh, lb.sh))::DOUBLE
                   / len(list_distinct(la.sh || lb.sh)) AS j
          FROM base la JOIN base lb ON la.id < lb.id),
        gold AS (SELECT a, b FROM allp WHERE j >= 0.5),
        ni AS (SELECT CAST(count(*) AS BIGINT) AS n_items FROM base),
        nc AS (SELECT CAST(count(*) AS BIGINT) AS n_cand FROM cand),
        ng AS (SELECT CAST(count(*) AS BIGINT) AS n_gold FROM gold),
        nt AS (SELECT CAST(count(*) AS BIGINT) AS n_true
               FROM cand c JOIN gold g ON g.a = c.a AND g.b = c.b)
        SELECT n_items,
               CAST(n_items * (n_items - 1) // 2 AS BIGINT) AS n_total_pairs,
               n_cand, n_gold, n_true,
               CASE WHEN n_gold > 0
                    THEN CAST((1000000 * n_true) // n_gold AS BIGINT)
                    ELSE CAST(-1 AS BIGINT) END AS pc_i,
               CASE WHEN n_cand > 0
                    THEN CAST((1000000 * n_true) // n_cand AS BIGINT)
                    ELSE CAST(-1 AS BIGINT) END AS pq_i,
               CASE WHEN n_items >= 2
                    THEN CAST((1000000 * (n_items * (n_items - 1) // 2 - n_cand))
                         // (n_items * (n_items - 1) // 2) AS BIGINT)
                    ELSE CAST(-1 AS BIGINT) END AS rr_i
        FROM ni, nc, ng, nt
    """
    o["kg_truthfinder_facts"] = _truthfinder_sql("facts", rounds=3)
    o["kg_truthfinder_trust"] = _truthfinder_sql("trust", rounds=3)
    o["kg_statement_reification"] = """
        WITH df AS (
          SELECT 'u' || doc_id AS url, 'Entity_' || (doc_id % 37) AS subj,
                 'acquired' AS pred, 'E' || (doc_id % 11) || ' Corp' AS obj,
                 'in' AS qualifier, CAST(1980 + doc_id % 40 AS VARCHAR) AS year
          FROM documents
          UNION ALL
          SELECT 'u' || doc_id, 'Entity_' || (doc_id % 37), 'based_in',
                 'City' || ((doc_id * 3) % 13), 'since',
                 CAST(1990 + doc_id % 30 AS VARCHAR)
          FROM documents
        ),
        b AS (SELECT md5(subj || '|' || pred || '|' || obj || '|'
                         || qualifier || '|' || year) AS stmt_id,
                     subj, pred, obj, qualifier, year, url FROM df),
        r AS (
          SELECT stmt_id, 'rdf:subject' AS prop, subj AS value FROM b
          UNION ALL SELECT stmt_id, 'rdf:predicate', pred FROM b
          UNION ALL SELECT stmt_id, 'rdf:object', obj FROM b
          UNION ALL SELECT stmt_id, 'kg:' || qualifier, year FROM b
          UNION ALL SELECT stmt_id, 'prov:wasDerivedFrom', url FROM b
        )
        SELECT DISTINCT stmt_id, prop, value FROM r
    """
    o["kg_interval_coalesce"] = """
        WITH obs AS (
          SELECT 'E' || (doc_id % 10) AS subj, 'active' AS pred, 'Y' AS obj,
                 CAST((doc_id * 13) % 997 AS BIGINT) AS ts
          FROM documents
        ),
        flagged AS (
          SELECT *, CASE WHEN lag(ts) OVER w IS NULL
                         OR ts - lag(ts) OVER w > 30 THEN 1 ELSE 0 END AS ni
          FROM obs WINDOW w AS (PARTITION BY subj, pred, obj ORDER BY ts)
        ),
        isl AS (
          SELECT *, sum(ni) OVER (PARTITION BY subj, pred, obj ORDER BY ts
                                  ROWS UNBOUNDED PRECEDING) AS island
          FROM flagged
        )
        SELECT subj, pred, obj,
               CAST(min(ts) AS BIGINT) AS valid_from,
               CAST(max(ts) AS BIGINT) AS valid_to,
               CAST(count(*) AS BIGINT) AS n_obs
        FROM isl GROUP BY subj, pred, obj, island
    """
    o["kg_allen_relations"] = """
        WITH iv AS (
          SELECT 'E' || (doc_id % 17) AS subj, doc_id AS fid,
                 CAST((doc_id * 3) % 29 AS BIGINT) AS s,
                 CAST((doc_id * 3) % 29 + 1 + (doc_id * 5) % 11 AS BIGINT) AS e
          FROM documents
        )
        SELECT a.subj, a.fid AS fid_a, b.fid AS fid_b,
               CASE
                 WHEN a.s = b.s AND a.e = b.e THEN 'equals'
                 WHEN a.e < b.s THEN 'before'
                 WHEN a.s > b.e THEN 'after'
                 WHEN a.e = b.s THEN 'meets'
                 WHEN a.s = b.e THEN 'met_by'
                 WHEN a.s = b.s AND a.e < b.e THEN 'starts'
                 WHEN a.s = b.s AND a.e > b.e THEN 'started_by'
                 WHEN a.e = b.e AND a.s > b.s THEN 'finishes'
                 WHEN a.e = b.e AND a.s < b.s THEN 'finished_by'
                 WHEN a.s > b.s AND a.e < b.e THEN 'during'
                 WHEN a.s < b.s AND a.e > b.e THEN 'contains'
                 WHEN a.s < b.s AND b.s < a.e AND a.e < b.e THEN 'overlaps'
                 WHEN b.s < a.s AND a.s < b.e AND b.e < a.e THEN 'overlapped_by'
               END AS rel
        FROM iv a JOIN iv b ON b.subj = a.subj AND a.fid < b.fid
        WHERE a.s < a.e AND b.s < b.e
    """
    o["quote_attribution"] = """
        SELECT 'u' || doc_id AS url,
               'Person' || (doc_id % 23) AS speaker,
               'Metric ' || (doc_id % 7) || ' improved by ' || (doc_id % 50)
                 || ' percent.' AS quote,
               'leading' AS arm
        FROM documents
        UNION ALL
        SELECT 'u' || doc_id,
               'Person' || ((doc_id + 5) % 23),
               'We expanded to City' || ((doc_id * 3) % 13),
               'trailing'
        FROM documents
    """
    o["acronym_alias_pairs"] = """
        WITH f AS (
          SELECT list_extract(['Global','United','National','Federal'],
                              CAST(doc_id % 4 + 1 AS INT)) AS w1,
                 list_extract(['Widget','Health','Trade','Data','Energy'],
                              CAST(doc_id % 5 + 1 AS INT)) AS w2
          FROM documents)
        SELECT w1 || ' ' || w2 || ' Organization' AS long_form,
               substr(w1, 1, 1) || substr(w2, 1, 1) || 'O' AS acronym,
               COUNT(*) AS n_mentions
        FROM f GROUP BY 1, 2
    """
    o["quantity_facts"] = """
        SELECT 'u' || doc_id AS url,
               'Entity_' || (doc_id % 37) AS subj,
               'revenue' AS pred,
               CAST(((doc_id % 9 + 1) * 10 + doc_id % 10)
                    * 1000000000000 AS BIGINT) AS value_i,
               'usd' AS unit
        FROM documents
        UNION ALL
        SELECT 'u' || doc_id, 'Entity_' || (doc_id % 37), 'employees',
               CAST(((doc_id % 90 + 1) * 1000 + 500) * 10000 AS BIGINT),
               'count'
        FROM documents
        UNION ALL
        SELECT 'u' || doc_id, 'Entity_' || (doc_id % 37), 'margin',
               CAST(((doc_id % 40) * 10 + 5) * 1000 AS BIGINT), 'pct'
        FROM documents
    """
    o["breadcrumb_taxonomy"] = """
        WITH f AS (
          SELECT doc_id % 6 AS a, doc_id % 4 AS b, doc_id % 30 AS c
          FROM documents),
        e AS (
          SELECT 'Sub' || a || '_' || b AS child, 'Cat' || a AS parent FROM f
          UNION ALL
          SELECT 'Item' || c, 'Sub' || a || '_' || b FROM f)
        SELECT child, parent, COUNT(*) AS n_pages FROM e GROUP BY 1, 2
    """
    o["crosslingual_aliases"] = """
        WITH gs AS (SELECT doc_id // 3 AS g,
                           CASE doc_id % 3 WHEN 0 THEN 'de'
                                           WHEN 1 THEN 'en'
                                           ELSE 'fr' END AS lang
                    FROM documents)
        SELECT 'https://ex.org/g' || a.g || '/de' AS cluster,
               a.lang AS lang_a, 'Name_' || a.lang || '_' || a.g AS subj_a,
               b.lang AS lang_b, 'Name_' || b.lang || '_' || b.g AS subj_b,
               CAST(1 AS BIGINT) AS n_shared
        FROM gs a JOIN gs b ON a.g = b.g AND a.lang < b.lang
    """
    o["kg_predicate_paraphrases"] = """
        WITH r AS (SELECT DISTINCT doc_id % 20 AS rr FROM documents),
        p AS (
          SELECT 'acquired' AS pred, 'E' || rr AS k FROM r
          UNION ALL SELECT 'bought', 'E' || rr FROM r WHERE rr < 15
          UNION ALL SELECT 'partnered_with', 'E' || rr FROM r WHERE rr >= 10
          UNION ALL SELECT 'owns', 'F' || rr FROM r
        ),
        sizes AS (SELECT pred, CAST(count(*) AS BIGINT) AS n FROM p GROUP BY 1),
        common AS (
          SELECT a.pred AS pred_a, b.pred AS pred_b,
                 CAST(count(*) AS BIGINT) AS n_common
          FROM p a JOIN p b ON a.k = b.k AND a.pred < b.pred
          GROUP BY 1, 2)
        SELECT c.pred_a, c.pred_b, c.n_common, sa.n AS n_a, sb.n AS n_b,
               CAST(c.n_common * 10000 // (sa.n + sb.n - c.n_common) AS BIGINT)
                 AS jaccard_i
        FROM common c
        JOIN sizes sa ON sa.pred = c.pred_a
        JOIN sizes sb ON sb.pred = c.pred_b
    """
    o["microdata_triples"] = """
        WITH d AS (SELECT doc_id AS i FROM documents)
        SELECT 'u' || i AS src_url, 'Person' || (i % 11) AS subj,
               'jobTitle' AS pred, 'Engineer' || (i % 3) AS obj,
               'Person' AS itype FROM d
        UNION ALL
        SELECT 'u' || i, 'Person' || (i % 11), 'birthDate',
               '19' || (50 + i % 40) || '-01-01', 'Person' FROM d
        UNION ALL
        SELECT 'u' || i, 'Org' || (i % 13), 'location',
               'City' || (i % 5), 'Organization' FROM d
    """
    o["rdfa_triples"] = """
        WITH d AS (SELECT doc_id AS i FROM documents)
        SELECT 'u' || i AS src_url, 'Agent' || (i % 9) AS subj,
               'jobTitle' AS pred, 'Analyst' || (i % 4) AS obj,
               'Person' AS itype FROM d
        UNION ALL
        SELECT 'u' || i, 'Agent' || (i % 9), 'birthDate',
               '19' || (60 + i % 30) || '-02-02', 'Person' FROM d
        UNION ALL
        SELECT 'u' || i, 'Co' || (i % 12), 'location',
               'Town' || (i % 6), 'Organization' FROM d
    """
    o["jaro_winkler_scores"] = """
        WITH ks AS (SELECT DISTINCT doc_id % 24 AS k FROM documents),
        p AS (
          SELECT k, 0 AS kind, 'Acme Corporation ' || k AS a,
                 'Acme Corporatoin ' || k AS b FROM ks
          UNION ALL
          SELECT k, 1, 'Acme Corporation ' || k, 'Acme Corp ' || k FROM ks
          UNION ALL
          SELECT k, 2, 'Acme Corporation ' || k, 'Zenith Widgets ' || k FROM ks
          UNION ALL
          SELECT k, 3, 'Entity ' || k || ' GmbH', 'Entity ' || k || ' Gmhb'
          FROM ks
        )
        SELECT k, kind,
               CAST(round(jaro_winkler_similarity(a, b) * 10000) AS BIGINT)
                 AS jw_i
        FROM p
    """
    o["zorder_bucket_pruning"] = """
        WITH pts AS (
          SELECT o_orderkey % 1024 AS x, (o_orderkey * 7 + 13) % 1024 AS y
          FROM orders
        ),
        s0 AS (SELECT x, y, x & 65535 AS xa, y & 65535 AS ya FROM pts),
        s1 AS (SELECT x, y, (xa | (xa << 8)) & 16711935 AS xb,
                            (ya | (ya << 8)) & 16711935 AS yb FROM s0),
        s2 AS (SELECT x, y, (xb | (xb << 4)) & 252645135 AS xc,
                            (yb | (yb << 4)) & 252645135 AS yc FROM s1),
        s3 AS (SELECT x, y, (xc | (xc << 2)) & 858993459 AS xd,
                            (yc | (yc << 2)) & 858993459 AS yd FROM s2),
        s4 AS (SELECT x, y, (xd | (xd << 1)) & 1431655765 AS xe,
                            (yd | (yd << 1)) & 1431655765 AS ye FROM s3),
        z AS (SELECT x, y, xe | (ye << 1) AS z FROM s4),
        per AS (
          SELECT z >> 14 AS bucket,
                 CAST(count(*) AS BIGINT) AS n_rows,
                 min(x) AS min_x, max(x) AS max_x,
                 min(y) AS min_y, max(y) AS max_y,
                 CAST(sum(CASE WHEN x BETWEEN 100 AND 300
                                AND y BETWEEN 400 AND 600
                               THEN 1 ELSE 0 END) AS BIGINT) AS rows_in_box
          FROM z GROUP BY 1
        )
        SELECT bucket, n_rows, min_x, max_x, min_y, max_y,
               CAST(CASE WHEN max_x >= 100 AND min_x <= 300
                          AND max_y >= 400 AND min_y <= 600
                         THEN 1 ELSE 0 END AS INT) AS touched_i,
               rows_in_box
        FROM per
    """
    o["kg_shacl_violations"] = """
        WITH ks AS (SELECT DISTINCT doc_id % 24 AS k FROM documents)
        SELECT 'P' || k AS subj, 'person' AS etype, 'works_for' AS pred,
               'max_count' AS violation,
               CAST(1 + CASE WHEN k % 5 = 0 THEN 1 ELSE 0 END
                      + CASE WHEN k % 7 = 0 THEN 1 ELSE 0 END AS BIGINT)
                 AS observed
        FROM ks WHERE k % 5 = 0 OR k % 7 = 0
        UNION ALL
        SELECT 'P' || k, 'person', 'works_for', 'class_range',
               CAST(1 AS BIGINT) FROM ks WHERE k % 7 = 0
        UNION ALL
        SELECT 'P' || k, 'person', 'email', 'min_count',
               CAST(0 AS BIGINT) FROM ks WHERE k % 3 = 0
        UNION ALL
        SELECT 'P' || k, 'person', 'nickname', 'closed',
               CAST(1 AS BIGINT) FROM ks WHERE k % 4 = 0
        UNION ALL
        SELECT 'C2', 'org', 'located_in', 'max_count', CAST(3 AS BIGINT)
    """
    o["orc_roundtrip"] = """
        WITH d AS (
          SELECT i,
                 'doc éü中 ' || i || ' with "quotes" and' || chr(10)
                   || 'newline tail ' || (i * i % 97) AS txt
          FROM range(300) t(i)
        )
        SELECT i - 5 AS doc_id,
               CASE WHEN i % 7 <> 0
                    THEN ['en','de','fr','es'][CAST(i % 4 AS INT) + 1] END AS lang,
               CAST(length(txt) AS BIGINT) AS n_chars,
               md5(txt) AS text_md5,
               CAST((i % 13) * 10000 AS BIGINT) AS score_i
        FROM d
    """
    o["hreflang_clusters"] = """
        WITH g AS (SELECT DISTINCT doc_id // 3 AS g FROM documents),
        l(lang) AS (VALUES ('de'), ('en'), ('fr'))
        SELECT 'https://ex.org/g' || g || '/de' AS cluster,
               'https://ex.org/g' || g || '/' || lang AS url,
               lang
        FROM g CROSS JOIN l
    """
    o["pagination_series"] = """
        WITH m AS (SELECT DISTINCT doc_id % 50 AS m FROM documents),
        g AS (SELECT DISTINCT m // 5 AS g FROM m WHERE m % 10 < 5)
        SELECT 'u' || (g * 5) AS series, CAST(5 AS BIGINT) AS n_pages,
               'u' || (g*5) || ',u' || (g*5+1) || ',u' || (g*5+2)
                 || ',u' || (g*5+3) || ',u' || (g*5+4) AS page_urls,
               'T' || (g*5) || chr(10) || 'T' || (g*5+1) || chr(10)
                 || 'T' || (g*5+2) || chr(10) || 'T' || (g*5+3)
                 || chr(10) || 'T' || (g*5+4) AS full_text
        FROM g
        UNION ALL
        SELECT 'u' || m, CAST(1 AS BIGINT), 'u' || m, 'T' || m
        FROM m WHERE m % 10 >= 5
    """
    o["canonical_clusters"] = """
        WITH m AS (SELECT DISTINCT doc_id % 40 AS m FROM documents)
        SELECT 'u' || m AS canonical, 'u' || m AS keeper,
               CAST(3 AS BIGINT) AS n_members, CAST(1 AS INT) AS in_corpus_i
        FROM m WHERE m % 4 = 0
        UNION ALL
        SELECT 'x' || m, 'u' || m, CAST(1 AS BIGINT), CAST(0 AS INT)
        FROM m WHERE m % 4 = 3
    """
    o["kg_type_violations"] = """
        WITH raw AS (SELECT DISTINCT doc_id % 30 AS k FROM documents),
        facts AS (
          SELECT DISTINCT * FROM (
            SELECT 'P' || k AS subj, 'works_for' AS pred,
                   CASE WHEN k % 7 = 0 THEN 'T' || (k % 4)
                        ELSE 'C' || (k % 6) END AS obj
            FROM raw
            UNION ALL
            SELECT 'C' || (k % 6), 'located_in', 'T' || ((k % 6) % 4) FROM raw
            UNION ALL
            SELECT 'Z' || k, 'lives_at', 'T' || (k % 4) FROM raw WHERE k % 3 = 0
            UNION ALL
            SELECT 'P' || k, 'lives_at', 'T' || (k % 4) FROM raw WHERE k % 3 = 1
          )
        ),
        types AS (
          SELECT DISTINCT * FROM (
            SELECT 'P' || k AS entity, 'person' AS etype FROM raw
            UNION ALL SELECT 'C' || (k % 6), 'org' FROM raw
            UNION ALL SELECT 'T' || (k % 4), 'place' FROM raw
          )
        ),
        typed AS (
          SELECT f.subj, f.pred, f.obj,
                 COALESCE(ts.etype, 'unknown') AS subj_type,
                 COALESCE(tob.etype, 'unknown') AS obj_type
          FROM facts f
          LEFT JOIN types ts ON ts.entity = f.subj
          LEFT JOIN types tob ON tob.entity = f.obj
        ),
        sig AS (
          SELECT pred, subj_type, obj_type, COUNT(*) AS n_sig
          FROM typed GROUP BY 1, 2, 3
        ),
        expected AS (
          SELECT pred, subj_type AS exp_subj_type, obj_type AS exp_obj_type,
                 n_sig AS exp_n
          FROM (SELECT *, ROW_NUMBER() OVER (
                  PARTITION BY pred
                  ORDER BY n_sig DESC, subj_type ASC, obj_type ASC) AS rk
                FROM sig)
          WHERE rk = 1
        ),
        np AS (SELECT pred, COUNT(*) AS n_pred FROM typed GROUP BY 1)
        SELECT t.subj, t.pred, t.obj, t.subj_type, t.obj_type,
               e.exp_subj_type, e.exp_obj_type,
               CAST(e.exp_n AS BIGINT) AS exp_n,
               CAST(np.n_pred AS BIGINT) AS n_pred
        FROM typed t JOIN expected e USING (pred) JOIN np USING (pred)
        WHERE t.subj_type <> e.exp_subj_type OR t.obj_type <> e.exp_obj_type
    """
    o["kg_horn_rules"] = """
        WITH raw AS (
          SELECT doc_id % 40 AS k, doc_id % 8 AS j, doc_id % 5 AS t
          FROM documents
        ),
        facts AS (
          SELECT DISTINCT * FROM (
            SELECT 'P' || k AS s, 'works_for' AS p, 'C' || (k % 8) AS o FROM raw
            UNION ALL
            SELECT 'C' || j, 'located_in', 'T' || (j % 5) FROM raw
            UNION ALL
            SELECT 'T' || t, 'capital_of', 'X' || (t % 2) FROM raw
            UNION ALL
            SELECT 'P' || k, 'lives_in',
                   'T' || (CASE WHEN k % 4 <> 0 THEN (k % 8) % 5
                                ELSE ((k % 8) + 1) % 5 END)
            FROM raw WHERE k % 5 <> 4
            UNION ALL
            SELECT 'P' || k, 'based_in',
                   'T' || (CASE WHEN k % 3 <> 0 THEN (k % 8) % 5
                                ELSE ((k % 8) + 2) % 5 END)
            FROM raw
          )
        ),
        body AS (
          SELECT DISTINCT l.p AS body1, r.p AS body2, l.s AS x, r.o AS y
          FROM facts l JOIN facts r ON l.o = r.s
        ),
        nb AS (SELECT body1, body2, COUNT(*) AS n_body FROM body GROUP BY 1, 2),
        sup AS (
          SELECT b.body1, b.body2, h.p AS head, COUNT(*) AS support
          FROM body b JOIN facts h ON h.s = b.x AND h.o = b.y
          GROUP BY 1, 2, 3
        ),
        nh AS (SELECT p AS head, COUNT(*) AS n_head FROM facts GROUP BY 1),
        pca AS (
          SELECT body1, body2, head, COUNT(*) AS n_pca FROM (
            SELECT DISTINCT b.body1, b.body2, hs.p AS head, b.x, b.y
            FROM body b JOIN (SELECT DISTINCT s, p FROM facts) hs ON hs.s = b.x
          ) GROUP BY 1, 2, 3
        )
        SELECT s.body1, s.body2, s.head,
               CAST(s.support AS BIGINT) AS support,
               CAST(nb.n_body AS BIGINT) AS n_body,
               CAST(nh.n_head AS BIGINT) AS n_head,
               CAST(pca.n_pca AS BIGINT) AS n_pca,
               CAST(s.support * 10000 // nb.n_body AS BIGINT) AS conf_i,
               CAST(s.support * 10000 // nh.n_head AS BIGINT) AS hc_i,
               CAST(s.support * 10000 // pca.n_pca AS BIGINT) AS pca_conf_i
        FROM sup s
        JOIN nb USING (body1, body2)
        JOIN nh USING (head)
        JOIN pca USING (body1, body2, head)
        WHERE s.support >= 2
    """
    o["hearst_hypernyms"] = """
        WITH d AS (SELECT doc_id AS i FROM documents)
        SELECT 'u' || i AS url, 'Acme' || (i % 7) AS subj, 'is_a' AS pred,
               'tools' AS obj, 'such_as' AS pattern FROM d
        UNION ALL
        SELECT 'u' || i, 'Beta' || (i % 5), 'is_a', 'tools', 'such_as' FROM d
        UNION ALL
        SELECT 'u' || i, 'Gamma' || (i % 3), 'is_a', 'tools', 'such_as'
        FROM d WHERE i % 2 = 0
        UNION ALL
        SELECT 'u' || i, 'New Corp' || (i % 4), 'is_a', 'vendors', 'and_other'
        FROM d
    """
    o["redirect_resolution"] = """
        WITH d AS (SELECT doc_id AS i, doc_id % 7 AS m FROM documents)
        SELECT 'u' || i AS src, 'u' || (i - m) AS final,
               CAST(m AS BIGINT) AS hops_i, CAST(0 AS INT) AS cyc_i
        FROM d WHERE m IN (1, 2, 3)
        UNION ALL
        SELECT 'u' || d.i,
               CASE WHEN p.i IS NULL THEN 'u' || (d.i + 1) ELSE 'u' || d.i END,
               CAST(CASE WHEN p.i IS NULL THEN 1 ELSE -1 END AS BIGINT),
               CAST(CASE WHEN p.i IS NULL THEN 0 ELSE 1 END AS INT)
        FROM d LEFT JOIN d p ON p.i = d.i + 1
        WHERE d.m = 5
        UNION ALL
        SELECT 'u' || i, 'u' || i, CAST(-1 AS BIGINT), CAST(1 AS INT)
        FROM d WHERE m = 6
    """
    o["geo_nearby_pairs"] = """
        WITH p AS (
          SELECT doc_id AS id,
                 CAST((doc_id % 10) * 3000 - 15000
                      + (doc_id * 7) % 200 AS BIGINT) AS lat_u,
                 CAST(((doc_id // 10) % 5) * 3000 - 7500
                      + (doc_id * 13) % 200 AS BIGINT) AS lon_u
          FROM documents)
        SELECT a.id AS id_a, b.id AS id_b,
               (a.lat_u - b.lat_u) * (a.lat_u - b.lat_u)
                 + (a.lon_u - b.lon_u) * (a.lon_u - b.lon_u) AS dist2
        FROM p a JOIN p b ON a.id < b.id
        WHERE (a.lat_u - b.lat_u) * (a.lat_u - b.lat_u)
                + (a.lon_u - b.lon_u) * (a.lon_u - b.lon_u) <= 22500
    """
    o["kg_snapshot_diff"] = """
        WITH a AS (SELECT DISTINCT doc_id % 40 AS a FROM documents)
        SELECT 'E' || a AS subj, 'based_in' AS pred,
               'City' || ((a * 3) % 13) AS obj_old,
               'City' || ((a * 3) % 13 + 1) AS obj_new,
               'changed' AS change
        FROM a WHERE a % 5 = 0
        UNION ALL
        SELECT 'E' || a, 'owns', 'Sub' || ((a * 5) % 11), NULL, 'removed'
        FROM a WHERE a % 7 = 0
        UNION ALL
        SELECT 'E' || a, 'ceo', NULL, 'Person' || ((a * 2) % 7), 'added'
        FROM a WHERE a % 3 = 0
    """
    o["kg_pronoun_coref"] = """
        SELECT 'u' || doc_id AS url, 1 AS sent_no,
               'Entity_' || (doc_id % 37) AS subj,
               'based_in' AS pred,
               'City' || ((doc_id * 3) % 13) AS obj
        FROM documents
        UNION ALL
        SELECT 'u' || doc_id, 4,
               'Person' || (doc_id % 7),
               'acquired',
               'Asset' || ((doc_id * 5) % 9)
        FROM documents
    """
    o["kg_fact_rank"] = f"""
        WITH t AS ({_kg_e2e_sql()}),
        facts AS (SELECT DISTINCT subj, pred, obj FROM t),
        dfs AS (SELECT pred, obj, CAST(count(DISTINCT subj) AS BIGINT) AS df
                FROM facts GROUP BY pred, obj),
        n AS (SELECT count(DISTINCT subj) AS n_subj_total FROM facts),
        scored AS (
          SELECT f.subj, f.pred, f.obj,
                 CAST(round(1e6 * ln(CAST(n.n_subj_total AS DOUBLE) / df))
                   AS BIGINT) AS idf_i
          FROM facts f JOIN dfs USING (pred, obj) CROSS JOIN n)
        SELECT subj, pred, obj, idf_i, CAST(rk AS INT) AS fact_rank FROM (
          SELECT *, row_number() OVER (PARTITION BY subj
                     ORDER BY idf_i DESC, pred, obj) AS rk
          FROM scored) WHERE rk <= 3
    """
    o["kg_related_entities"] = f"""
        WITH t AS ({_kg_e2e_sql()}),
        m AS (SELECT DISTINCT url, entity FROM (
                SELECT url, subj AS entity FROM t
                UNION ALL SELECT url, obj FROM t)),
        n AS (SELECT count(DISTINCT url) AS n_pages FROM m),
        ent AS (SELECT entity, CAST(count(*) AS BIGINT) AS c
                FROM m GROUP BY entity),
        pairs AS (
          SELECT l.entity AS a, r.entity AS b,
                 CAST(count(*) AS BIGINT) AS n_pages_pair
          FROM m l JOIN m r ON l.url = r.url AND l.entity < r.entity
          GROUP BY a, b HAVING count(*) >= 2)
        SELECT p.a, p.b, p.n_pages_pair,
               CAST(round(1e6 * ln(
                 CAST(p.n_pages_pair * n.n_pages AS DOUBLE) / (ea.c * eb.c)))
                 AS BIGINT) AS pmi_i
        FROM pairs p
        JOIN ent ea ON ea.entity = p.a
        JOIN ent eb ON eb.entity = p.b
        CROSS JOIN n
    """
    o["kg_bgp_optional"] = f"""
        WITH t AS ({_kg_e2e_sql()}),
        req AS (SELECT DISTINCT obj AS x, subj AS y FROM t
                WHERE pred = 'acquired'),
        o1 AS (SELECT DISTINCT subj AS x, obj AS city FROM t
               WHERE pred = 'based_in'),
        o2 AS (SELECT DISTINCT subj AS x, obj AS f FROM t
               WHERE pred = 'founded_by')
        SELECT r.x, r.y, o1.city, o2.f
        FROM req r LEFT JOIN o1 USING (x) LEFT JOIN o2 USING (x)
    """
    o["kg_property_path"] = f"""
        WITH t AS ({_kg_e2e_sql()}),
        s1 AS (SELECT DISTINCT obj AS src, subj AS dst FROM t
               WHERE pred = 'founded_by'),
        edges AS (SELECT DISTINCT subj AS src, obj AS dst FROM t
                  WHERE pred IN ('owns', 'acquired') AND subj <> obj),
        cl AS (
          SELECT DISTINCT src, dst FROM (
            WITH RECURSIVE reach AS (
              SELECT src, dst, 1 AS hops FROM edges
              UNION
              SELECT r.src, e.dst, r.hops + 1
              FROM reach r JOIN edges e ON e.src = r.dst WHERE r.hops < 4
            )
            SELECT src, dst FROM reach)),
        s2 AS (SELECT DISTINCT l.src, r.dst FROM s1 l
               JOIN cl r ON r.src = l.dst)
        SELECT DISTINCT s2.src, b.obj AS dst
        FROM s2 JOIN t b ON b.pred = 'based_in' AND b.subj = s2.dst
    """
    o["kg_transitive_closure"] = f"""
        WITH t AS ({_kg_e2e_sql()}),
        edges AS (SELECT DISTINCT subj AS src, obj AS dst FROM t
                  WHERE pred IN ('owns', 'acquired') AND subj <> obj)
        SELECT src, dst, hops FROM (
          WITH RECURSIVE reach AS (
            SELECT src, dst, 1 AS hops FROM edges
            UNION
            SELECT r.src, e.dst, r.hops + 1
            FROM reach r JOIN edges e ON e.src = r.dst WHERE r.hops < 4
          )
          SELECT src, dst, min(hops) AS hops FROM reach GROUP BY src, dst
        )
    """
    o["kg_triangles"] = f"""
        WITH t AS ({_kg_e2e_sql()}),
        ee AS (SELECT DISTINCT least(subj, obj) AS a, greatest(subj, obj) AS b
               FROM t WHERE subj <> obj
                 AND pred IN ('acquired', 'owns', 'partnered_with'))
        SELECT e1.a AS a, e1.b AS b, e2.b AS c
        FROM ee e1
        JOIN ee e2 ON e2.a = e1.b
        JOIN ee e3 ON e3.a = e1.a AND e3.b = e2.b
    """
    # shared typing CTE chain (expects a preceding `t AS (...)` triples CTE):
    # mirrors graph_query.type_entities' precedence exactly.
    _types_cte = """
        mentions AS (
          SELECT subj AS entity, FALSE AS pl, FALSE AS pe FROM t
          UNION ALL
          SELECT obj, pred IN ('based_in', 'located_in'),
                 pred IN ('founded_by', 'works_for') FROM t
        ),
        flags AS (SELECT entity, max(pl) AS is_place, max(pe) AS is_person_rel
                  FROM mentions GROUP BY entity),
        ty AS (
          SELECT entity,
            CASE WHEN is_place THEN 'place'
                 WHEN is_person_rel THEN 'person'
                 WHEN regexp_matches(entity,
                      '\\b(Corp|Corporation|Inc|Ltd|LLC|GmbH|Co|Company)$')
                   THEN 'org'
                 WHEN regexp_matches(entity, '^[A-Z][a-z]+ [A-Z][a-z]+$')
                   THEN 'person'
                 ELSE 'other' END AS etype
          FROM flags)
    """
    o["kg_entity_types"] = f"""
        WITH t AS ({_kg_e2e_sql()}),
        {_types_cte}
        SELECT entity, etype FROM ty
    """
    o["kg_predicate_profile"] = f"""
        WITH t AS ({_kg_e2e_sql()}),
        {_types_cte}
        SELECT pred, ts.etype AS subj_type, tob.etype AS obj_type,
               CAST(count(*) AS BIGINT) AS n_triples,
               CAST(count(DISTINCT t.subj) AS BIGINT) AS n_subj,
               CAST(count(DISTINCT t.obj) AS BIGINT) AS n_obj
        FROM t
        JOIN ty ts ON t.subj = ts.entity
        JOIN ty tob ON t.obj = tob.entity
        GROUP BY pred, ts.etype, tob.etype
    """
    o["warc_roundtrip_extract"] = f"""
        SELECT url, strftime(warc_ts, '%Y-%m-%d %H:%M:%S') AS ts_s,
               md5(decode(html)) AS html_md5,
               CAST(octet_length(html) AS BIGINT) AS n_bytes
        FROM read_parquet('{_ensure_simple_corpus()}')
    """
    o["line_dedup_boilerplate"] = f"""
        WITH raw AS (SELECT url AS doc_id, decode(html) AS txt
                     FROM read_parquet('{_ensure_simple_corpus()}')),
        lines AS (
          SELECT doc_id, l AS line, lower(trim(l)) AS norm, ord FROM (
            SELECT doc_id, unnest(string_split(txt, chr(10))) AS l,
                   generate_subscripts(string_split(txt, chr(10)), 1) AS ord
            FROM raw)
        ),
        freq AS (SELECT norm FROM lines WHERE norm <> ''
                 GROUP BY norm HAVING count(DISTINCT doc_id) >= 3),
        flagged AS (
          SELECT l.doc_id, l.line, l.ord, (f.norm IS NOT NULL) AS is_dup
          FROM lines l LEFT JOIN freq f ON l.norm = f.norm
        )
        SELECT doc_id,
               md5(coalesce(string_agg(CASE WHEN NOT is_dup THEN line END,
                                       chr(10) ORDER BY ord), '')) AS clean_md5,
               CAST(sum(CASE WHEN is_dup THEN 0 ELSE 1 END) AS BIGINT) AS n_kept,
               CAST(sum(CASE WHEN is_dup THEN 1 ELSE 0 END) AS BIGINT) AS n_dropped
        FROM flagged GROUP BY doc_id
    """
    o["url_canonicalize"] = """
        SELECT doc_id,
          'HTTPS://WWW.Site' || (doc_id % 7) || '.ORG:443/Page/' || doc_id ||
            CASE doc_id % 4
              WHEN 0 THEN '/?utm_source=feed&b=2&a=1'
              WHEN 1 THEN '/#frag'
              WHEN 2 THEN '?fbclid=x&z=9&y=' || (doc_id % 5)
              ELSE '' END AS raw_url,
          'https://www.site' || (doc_id % 7) || '.org/Page/' || doc_id ||
            CASE doc_id % 4
              WHEN 0 THEN '?a=1&b=2'
              WHEN 2 THEN '?y=' || (doc_id % 5) || '&z=9'
              ELSE '' END AS canon_url
        FROM documents
    """
    o["url_latest_crawl"] = """
        SELECT 'https://site.org/p/' || (doc_id % 50) AS canon_url,
               max(doc_id) AS doc_id,
               CAST(max(doc_id) AS BIGINT) AS crawl_ts
        FROM documents GROUP BY doc_id % 50
    """
    o["semantic_dedup_pairs"] = """
        WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        c AS (SELECT vec_id AS cid, v AS cv FROM e WHERE vec_id < 8),
        cos AS (
          SELECT e.vec_id, c.cid,
                 list_dot_product(e.v, c.cv)
                   / (sqrt(list_dot_product(e.v, e.v))
                      * sqrt(list_dot_product(c.cv, c.cv))) AS cs
          FROM e, c),
        asg AS (
          SELECT vec_id, cid FROM (
            SELECT vec_id, cid,
                   row_number() OVER (PARTITION BY vec_id
                                      ORDER BY cs DESC, cid) AS rn
            FROM cos) WHERE rn = 1),
        p AS (
          SELECT a.vec_id AS va, b.vec_id AS vb, CAST(a.cid AS BIGINT) AS cid,
                 CAST(round(10000 * list_dot_product(ea.v, eb.v)
                   / (sqrt(list_dot_product(ea.v, ea.v))
                      * sqrt(list_dot_product(eb.v, eb.v)))) AS BIGINT) AS cos_i
          FROM asg a JOIN asg b ON a.cid = b.cid AND a.vec_id < b.vec_id
          JOIN e ea ON ea.vec_id = a.vec_id
          JOIN e eb ON eb.vec_id = b.vec_id)
        SELECT va, vb, cid, cos_i FROM p WHERE cos_i >= 3500
    """
    # unigram corpus-self LM CTE chain, shared by the score gate and the
    # CCNet bucket gate (keep the twins from drifting)
    _unigram_lm_cte = r"""
        toks AS (
          SELECT doc_id, tok FROM (
            SELECT doc_id,
                   unnest(regexp_split_to_array(lower(text), '\s+')) AS tok
            FROM documents) WHERE tok <> ''),
        total AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM toks),
        vocab AS (
          SELECT tok,
                 CAST(round(1000000 * ln(count(*) / (SELECT n FROM total)))
                      AS BIGINT) AS logp_i
          FROM toks GROUP BY tok),
        lm AS (
          SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
                 CAST(sum(logp_i) AS BIGINT) AS sum_logp_i
          FROM toks JOIN vocab USING (tok) GROUP BY doc_id)
    """
    o["unigram_lm_scores"] = (
        "WITH " + _unigram_lm_cte + "SELECT doc_id, n_tokens, sum_logp_i FROM lm"
    )
    o["ccnet_perplexity_buckets"] = (
        "WITH "
        + _unigram_lm_cte
        + """,
        scored AS (
          SELECT l.doc_id, d.lang,
                 CAST((-sum_logp_i) // n_tokens AS BIGINT) AS mean_nll_i
          FROM lm l JOIN documents d USING (doc_id)),
        th AS (
          SELECT lang,
                 CAST(quantile_disc(mean_nll_i, 1.0/3.0) AS BIGINT) AS t_lo_i,
                 CAST(quantile_disc(mean_nll_i, 2.0/3.0) AS BIGINT) AS t_hi_i
          FROM scored GROUP BY lang)
        SELECT s.doc_id, s.lang, s.mean_nll_i, th.t_lo_i, th.t_hi_i,
               CASE WHEN mean_nll_i <= t_lo_i THEN 'head'
                    WHEN mean_nll_i <= t_hi_i THEN 'middle'
                    ELSE 'tail' END AS bucket
        FROM scored s JOIN th USING (lang)
    """
    )
    o["kg_extraction_eval"] = (
        "WITH mined AS (SELECT DISTINCT subj, pred, obj FROM ("
        + _e3_sql()
        + """)),
        dd AS (SELECT doc_id AS i FROM documents),
        gold AS (
          SELECT DISTINCT 'Entity_' || (i % 37) AS subj, 'acquired' AS pred,
                 'E' || (i % 11) || ' Corp' AS obj
          FROM dd WHERE i % 4 <> 0
          UNION
          SELECT DISTINCT 'Entity_' || (i % 37), 'acquired', 'Phantom Corp'
          FROM dd WHERE i % 6 = 0
          UNION
          SELECT DISTINCT 'Entity_' || (i % 37), 'based_in', 'Berlin' FROM dd
          UNION
          SELECT DISTINCT 'Ada Byron', 'works_for', 'Entity_' || (i % 5) FROM dd
          UNION
          SELECT DISTINCT 'Entity_' || (i % 37), 'founded_by',
                 'Founder_' || (i % 7)
          FROM dd
        ),
        tp AS (SELECT pred, CAST(count(*) AS BIGINT) AS tp
               FROM (SELECT * FROM mined INTERSECT SELECT * FROM gold)
               GROUP BY pred),
        np AS (SELECT pred, CAST(count(*) AS BIGINT) AS n_pred
               FROM mined GROUP BY pred),
        ng AS (SELECT pred, CAST(count(*) AS BIGINT) AS n_gold
               FROM gold GROUP BY pred),
        m AS (SELECT coalesce(np.pred, ng.pred) AS pred,
                     coalesce(np.n_pred, 0) AS n_pred,
                     coalesce(ng.n_gold, 0) AS n_gold
              FROM np FULL JOIN ng ON ng.pred = np.pred)
        SELECT m.pred, m.n_pred, m.n_gold,
               CAST(coalesce(tp.tp, 0) AS BIGINT) AS tp,
               CAST(CASE WHEN m.n_pred > 0
                    THEN 1000000 * coalesce(tp.tp, 0) // m.n_pred
                    ELSE -1 END AS BIGINT) AS precision_i,
               CAST(CASE WHEN m.n_gold > 0
                    THEN 1000000 * coalesce(tp.tp, 0) // m.n_gold
                    ELSE -1 END AS BIGINT) AS recall_i,
               CAST(CASE WHEN m.n_pred + m.n_gold > 0
                    THEN 2000000 * coalesce(tp.tp, 0) // (m.n_pred + m.n_gold)
                    ELSE -1 END AS BIGINT) AS f1_i
        FROM m LEFT JOIN tp ON tp.pred = m.pred
    """
    )
    o["kg_attribute_merge"] = """
        WITH ks AS (SELECT DISTINCT doc_id % 30 AS k FROM documents
                    WHERE (doc_id % 30) % 3 <> 0)
        SELECT 'Alt' || k AS a, 'Dup' || k AS b,
               CAST(3 AS BIGINT) AS n_shared,
               CAST(3 AS BIGINT) AS n_facts_a,
               CAST(CASE WHEN k % 2 = 0 THEN 4 ELSE 3 END AS BIGINT)
                 AS n_facts_b,
               CAST(CASE WHEN k % 2 = 0 THEN 750000 ELSE 1000000 END AS BIGINT)
                 AS jaccard_i
        FROM ks
    """
    o["html_list_triples"] = """
        WITH d AS (SELECT doc_id AS i FROM documents)
        SELECT 'u' || i AS src_url, 'Page ' || (i % 20) AS subj,
               'list:products' AS pred, 'Alpha ' || (i % 4) AS obj,
               CAST(1 AS INTEGER) AS pos
        FROM d
        UNION ALL
        SELECT 'u' || i, 'Page ' || (i % 20), 'list:products',
               'Beta ' || (i % 3), CAST(2 AS INTEGER)
        FROM d
        UNION ALL
        SELECT 'u' || i, 'Page ' || (i % 20), 'list:team_members',
               'Member ' || (i % 5), CAST(1 AS INTEGER)
        FROM d
    """
    o["colist_expansion"] = """
        WITH d AS (SELECT doc_id AS i FROM documents),
        m AS (
          SELECT DISTINCT 'u' || i || '|list:tags' AS list_id,
                 'Tag ' || (i % 6) AS item FROM d
          UNION SELECT 'u' || i || '|list:tags', 'Tag ' || ((i + 1) % 6) FROM d
          UNION SELECT 'u' || i || '|list:tags', 'Tag ' || ((i * 3 + 2) % 6) FROM d
          UNION SELECT 'u' || i || '|list:reviewers', 'Person ' || (i % 9) FROM d
          UNION SELECT 'u' || i || '|list:reviewers', 'Person ' || ((i + 2) % 9)
          FROM d
        ),
        sl AS (SELECT DISTINCT list_id FROM m
               WHERE item IN ('Tag 0', 'Person 4')),
        tot AS (SELECT item, count(*) AS n_lists FROM m GROUP BY item),
        sh AS (
          SELECT item, count(*) AS n_shared_lists FROM m
          WHERE list_id IN (SELECT list_id FROM sl)
            AND item NOT IN ('Tag 0', 'Person 4')
          GROUP BY item)
        SELECT sh.item,
               CAST(sh.n_shared_lists AS BIGINT) AS n_shared_lists,
               CAST(tot.n_lists AS BIGINT) AS n_lists,
               CAST((1000000 * sh.n_shared_lists) // tot.n_lists AS BIGINT)
                 AS support_i
        FROM sh JOIN tot ON tot.item = sh.item
    """
    o["mention_bursts"] = """
        WITH d AS (SELECT doc_id AS i FROM documents),
        m AS (
          SELECT 'E' || (i % 7) AS entity, 3 * (i % 5) AS day FROM d
          UNION ALL SELECT 'Dense', i % 15 FROM d
          UNION ALL SELECT 'New' || (i % 100), CAST(5 AS BIGINT)
          FROM d WHERE i % 50 = 0
        ),
        daily AS (SELECT entity, day, CAST(count(*) AS BIGINT) AS n_mentions
                  FROM m GROUP BY entity, day),
        t AS (SELECT entity, day, n_mentions,
                     CAST(coalesce(sum(n_mentions) OVER (
                       PARTITION BY entity ORDER BY day
                       RANGE BETWEEN 7 PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
                       AS trailing_sum
              FROM daily)
        SELECT entity, day, n_mentions, trailing_sum,
               CAST(CASE WHEN n_mentions >= 3 AND (trailing_sum = 0
                          OR n_mentions * 7 * 1000 >= 3000 * trailing_sum)
                    THEN 1 ELSE 0 END AS INTEGER) AS is_burst_i
        FROM t
    """
    o["kg_literal_datatypes"] = """
        WITH dd AS (SELECT doc_id AS i FROM documents),
        shaped AS (
          SELECT 'founded_in' AS pred,
                 CASE WHEN i % 10 = 0 THEN 'text' ELSE 'year' END AS dtype
          FROM dd
          UNION ALL
          SELECT 'employees',
                 -- the year-SHAPE overlap (caught by the r4 sf0.1 sweep):
                 -- employee counts 1800..2099 are indistinguishable from
                 -- years by value shape, exactly as the operator's
                 -- documented rule table classifies them
                 CASE WHEN i % 7 = 0 THEN 'decimal'
                      WHEN i BETWEEN 1800 AND 2099 THEN 'year'
                      ELSE 'integer' END
          FROM dd
          UNION ALL SELECT 'launched', 'date' FROM dd
          UNION ALL SELECT 'homepage', 'url' FROM dd
          UNION ALL SELECT 'ceo', 'proper_name' FROM dd
          UNION ALL SELECT 'note', 'text' FROM dd
        ),
        prof AS (SELECT pred, dtype, CAST(count(*) AS BIGINT) AS n_values
                 FROM shaped GROUP BY pred, dtype),
        tot AS (SELECT pred, CAST(sum(n_values) AS BIGINT) AS n_total
                FROM prof GROUP BY pred)
        SELECT p.pred, p.dtype, p.n_values, t.n_total,
               CAST(1000 * p.n_values // t.n_total AS BIGINT) AS share_pm,
               CAST(CASE WHEN row_number() OVER (
                      PARTITION BY p.pred
                      ORDER BY p.n_values DESC, p.dtype ASC) = 1
                    THEN 1 ELSE 0 END AS INTEGER) AS is_dominant_i
        FROM prof p JOIN tot t USING (pred)
    """
    o["appositive_isa"] = """
        WITH d AS (SELECT doc_id AS i FROM documents)
        SELECT 'u' || i AS url, 'Acme' || (i % 7) || ' Corp' AS subj,
               'is_a' AS pred, 'vendor' AS obj,
               'family-run software vendor' AS phrase,
               'appositive' AS pattern
        FROM d
        UNION ALL
        SELECT 'u' || i, 'Beta' || (i % 5), 'is_a', 'engine', 'engine',
               'appositive'
        FROM d
    """
    o["homograph_spoof_pairs"] = """
        WITH ks AS (SELECT DISTINCT doc_id % 40 AS k FROM documents)
        SELECT 'acme' || k AS a, 'аcme' || k AS b, 'acme' || k AS skeleton,
               CAST(1 AS INTEGER) AS a_ascii_i, CAST(0 AS INTEGER) AS b_ascii_i,
               CAST(1 AS INTEGER) AS is_spoof_i
        FROM ks WHERE k % 4 = 0
        UNION ALL
        SELECT 'acme' || k, 'acmе' || k, 'acme' || k, 1, 0, 1
        FROM ks WHERE k % 8 = 0
        UNION ALL
        SELECT 'acmе' || k, 'аcme' || k, 'acme' || k, 0, 0, 0
        FROM ks WHERE k % 8 = 0
    """

    def _overlap_sql(key: str, item: str) -> str:
        # DuckDB twin of linkgraph._overlap_pairs over the closed-form host
        # edge set; key/item select co-citation vs coupling
        return f"""
        WITH e0 AS ({_host_edges_sql()}),
        ed AS (SELECT DISTINCT {key} AS key, {item} AS item FROM e0),
        small AS (SELECT key FROM (SELECT key, count(*) AS c FROM ed GROUP BY key)
                  WHERE c <= 1000),
        d AS (SELECT ed.key, ed.item FROM ed JOIN small USING (key)),
        deg AS (SELECT item, CAST(count(*) AS BIGINT) AS deg FROM d GROUP BY item),
        p AS (SELECT l.item AS a, r.item AS b, CAST(count(*) AS BIGINT) AS n_common
              FROM d l JOIN d r ON r.key = l.key AND l.item < r.item
              GROUP BY 1, 2)
        SELECT p.a, p.b, p.n_common, da.deg AS deg_a, db.deg AS deg_b,
               CAST(1000000 * p.n_common // (da.deg + db.deg - p.n_common)
                    AS BIGINT) AS jaccard_i
        FROM p JOIN deg da ON da.item = p.a JOIN deg db ON db.item = p.b
        """

    o["host_cocitation_pairs"] = _overlap_sql("src", "dst")
    o["host_coupling_pairs"] = _overlap_sql("dst", "src")
    o["kg_scc_bounded"] = """
        WITH r4 AS (SELECT DISTINCT doc_id % 4 AS j FROM documents),
        m3 AS (SELECT DISTINCT doc_id % 3 AS m FROM documents)
        SELECT 'R' || j AS node, 'R0' AS scc_id, CAST(4 AS BIGINT) AS scc_size
        FROM r4
        UNION ALL
        SELECT 'A' || m, 'A' || m, CAST(2 AS BIGINT) FROM m3
        UNION ALL
        SELECT 'B' || m, 'A' || m, CAST(2 AS BIGINT) FROM m3
        UNION ALL
        SELECT node, node, CAST(1 AS BIGINT)
        FROM (VALUES ('C0'), ('C1'), ('C2'), ('X')) v(node)
    """
    o["kg_entity_timeline"] = """
        WITH facts AS (
          SELECT DISTINCT 'Entity_' || (doc_id % 37) AS subj,
                 'acquired' AS pred, 'E' || (doc_id % 11) || ' Corp' AS obj,
                 'in' AS qualifier, CAST(1980 + doc_id % 40 AS INT) AS year
          FROM documents
          UNION
          SELECT DISTINCT 'Entity_' || (doc_id % 37), 'based_in',
                 'City' || ((doc_id * 3) % 13), 'since',
                 CAST(1990 + doc_id % 30 AS INT)
          FROM documents
        )
        SELECT subj, CAST(count(*) AS BIGINT) AS n_events,
               CAST(min(year) AS INT) AS first_year,
               CAST(max(year) AS INT) AS last_year,
               string_agg(year || ' ' || qualifier || ' ' || pred || ' ' || obj,
                          ' | ' ORDER BY year, pred, obj, qualifier) AS timeline
        FROM facts GROUP BY subj
    """
    o["soft404_detect"] = """
        WITH d AS (
          SELECT doc_id AS i,
                 CASE
                   WHEN doc_id % 5 = 0 THEN
                     '<html><title>404 Error - Page Not Found</title><body><p>'
                     || 'The page you requested does not exist.</p></body></html>'
                   WHEN doc_id % 5 = 1 THEN
                     '<html><title>History of the 404 error</title><body><p>'
                     || repeat(' filler words here', 40)
                     || ' page not found lore continues.</p></body></html>'
                   ELSE
                     '<html><title>Doc ' || (doc_id % 9)
                     || '</title><body><p>regular content ' || (doc_id % 7)
                     || '</p></body></html>'
                 END AS html
          FROM documents
        ),
        x AS (
          SELECT i,
                 trim(regexp_extract(html, '(?s)<title[^>]*>(.*?)</title>', 1))
                   AS title,
                 trim(regexp_replace(regexp_replace(html, '<[^>]*>', ' ', 'gs'),
                                     '\\s+', ' ', 'g')) AS visible
          FROM d
        ),
        sig AS (
          SELECT i, title, CAST(length(visible) AS BIGINT) AS n_chars,
                 (regexp_matches(lower(title),
                    'page not found|404 error|error 404|does not exist|no longer available|page you requested')
                  OR regexp_matches(lower(visible),
                    'page not found|404 error|error 404|does not exist|no longer available|page you requested'))
                   AS hm
          FROM x
        )
        SELECT 'u' || i AS url, title, n_chars,
               CAST(CASE WHEN hm THEN 1 ELSE 0 END AS INTEGER) AS has_marker_i,
               CAST(CASE WHEN hm AND n_chars < 500 THEN 1 ELSE 0 END AS INTEGER)
                 AS is_soft404_i
        FROM sig
    """
    o["according_to_claims"] = """
        SELECT 'u' || doc_id AS url,
               'Analyst' || (doc_id % 9) AS source,
               'revenue grew ' || (doc_id % 30) || ' percent' AS claim
        FROM documents
    """
    o["entity_authority"] = f"""
        WITH ids AS (
          SELECT CAST(regexp_extract(url, 'a/(\\d+)$', 1) AS BIGINT) AS i, url
          FROM read_parquet('{_ensure_link_corpus()}')),
        m AS (
          SELECT 'Ent' || (i % 9) AS entity,
                 regexp_extract(url, '^[a-z]+://([^/:?#]*)', 1) AS host
          FROM ids
          UNION ALL
          SELECT 'Ent' || (i % 9),
                 regexp_extract(url, '^[a-z]+://([^/:?#]*)', 1)
          FROM ids WHERE i % 2 = 0
          UNION ALL
          SELECT 'Ent0', 'unranked.example.net' FROM ids WHERE i % 5 = 0
        ),
        pr AS (SELECT * FROM ({_pagerank_sql(edges_sql=_host_edges_sql())}))
        SELECT m.entity, CAST(count(*) AS BIGINT) AS n_mentions,
               CAST(count(DISTINCT m.host) AS BIGINT) AS n_hosts,
               CAST(sum(coalesce(pr.pr_i, 0)) AS BIGINT) AS authority_i
        FROM m LEFT JOIN pr ON pr.node = m.host
        GROUP BY m.entity
    """
    o["kg_datatype_enforce"] = """
        WITH dd AS (SELECT doc_id AS i FROM documents),
        f AS (
          SELECT 'S' || i AS subj, 'founded_in' AS pred,
                 CASE WHEN i % 10 = 0 THEN 'circa ' || (1900 + i % 100)
                      ELSE CAST(1900 + i % 100 AS VARCHAR) END AS obj,
                 CASE WHEN i % 10 = 0 THEN 'text' ELSE 'year' END AS dtype,
                 'year' AS exp_dtype
          FROM dd
          UNION ALL
          SELECT 'S' || i, 'employees',
                 CASE WHEN i % 7 = 0 THEN (i % 20) || '.5'
                      ELSE CAST(i AS VARCHAR) END,
                 -- year-shape overlap for counts 1800..2099 (r4 sf0.1
                 -- sweep); dominance stays integer at every sf (the
                 -- overlap is a fixed 300-id band)
                 CASE WHEN i % 7 = 0 THEN 'decimal'
                      WHEN i BETWEEN 1800 AND 2099 THEN 'year'
                      ELSE 'integer' END,
                 'integer'
          FROM dd
          UNION ALL
          SELECT 'S' || i, 'launched',
                 '2020-' || lpad(CAST((i % 12) + 1 AS VARCHAR), 2, '0')
                 || '-' || lpad(CAST((i % 28) + 1 AS VARCHAR), 2, '0'),
                 'date', 'date'
          FROM dd
          UNION ALL
          SELECT 'S' || i, 'homepage', 'https://h' || (i % 9) || '.org',
                 'url', 'url'
          FROM dd
          UNION ALL
          SELECT 'S' || i, 'ceo', 'Ada Byron ' || (i % 5),
                 'proper_name', 'proper_name'
          FROM dd
          UNION ALL
          SELECT 'S' || i, 'note', 'plain lowercase words', 'text', 'text'
          FROM dd
        )
        SELECT subj, pred, obj, dtype, exp_dtype,
               CAST(CASE WHEN dtype = exp_dtype THEN 1 ELSE 0 END AS INTEGER)
                 AS conforms_i
        FROM f
    """
    o["anchor_typed_edges"] = """
        WITH d AS (SELECT doc_id AS i FROM documents)
        SELECT 'https://w.example/p/' || i AS src_url,
               'Page ' || (i % 20) AS subj, 'homepage' AS pred,
               'https://e' || (i % 6) || '.example' AS obj
        FROM d
        UNION ALL
        SELECT 'https://w.example/p/' || i, 'Page ' || (i % 20),
               'contact_page', 'https://w.example/contact'
        FROM d
        UNION ALL
        SELECT 'https://w.example/p/' || i, 'Page ' || (i % 20),
               'source_repo', 'https://g.example/r' || (i % 4)
        FROM d
    """
    o["domain_rollup"] = """
        WITH d AS (SELECT doc_id AS i FROM documents)
        SELECT 'shop' || (i % 10) || '.co.uk' AS domain,
               CAST(count(*) AS BIGINT) AS n_pages,
               CAST(count(DISTINCT i % 4) AS BIGINT) AS n_hosts,
               CAST(count(DISTINCT i) AS BIGINT) AS n_urls
        FROM d GROUP BY i % 10
        UNION ALL
        SELECT 'example' || (i % 5) || '.org',
               CAST(count(*) AS BIGINT), CAST(1 AS BIGINT),
               CAST(count(DISTINCT i % 3) AS BIGINT)
        FROM d GROUP BY i % 5
        UNION ALL
        SELECT 'plain' || (i % 7) || '.net',
               CAST(count(*) AS BIGINT), CAST(1 AS BIGINT), CAST(1 AS BIGINT)
        FROM d GROUP BY i % 7
    """
    o["host_outlink_profile"] = f"""
        WITH l AS ({_linked_links_sql()}),
        h AS (
          SELECT regexp_extract(src_url, '^[a-z]+://([^/:?#]*)', 1) AS src_host,
                 regexp_extract(dst_url, '^[a-z]+://([^/:?#]*)', 1) AS dst_host
          FROM l)
        SELECT src_host,
               CAST(count(*) AS BIGINT) AS n_links,
               CAST(count(DISTINCT dst_host) AS BIGINT) AS n_dst_hosts,
               CAST(sum(CASE WHEN dst_host = src_host THEN 1 ELSE 0 END)
                 AS BIGINT) AS n_self,
               CAST(round(10000.0 * count(DISTINCT dst_host) / count(*))
                 AS BIGINT) AS diversity_i
        FROM h GROUP BY src_host
    """
    o["media_type_sniff"] = """
        SELECT doc_id,
               CASE doc_id % 10
                 WHEN 0 THEN 'netpbm_pgm'
                 WHEN 1 THEN 'netpbm_ppm'
                 WHEN 2 THEN 'riff_wav'
                 WHEN 3 THEN 'riff_other'
                 WHEN 4 THEN 'pdf'
                 WHEN 5 THEN 'zip'
                 WHEN 6 THEN 'gzip'
                 WHEN 7 THEN 'png'
                 WHEN 8 THEN 'jpeg'
                 ELSE 'unknown' END AS media_type
        FROM documents
    """
    o["script_profile"] = """
        WITH c AS (
          SELECT doc_id,
                 CAST(4 * (2 + doc_id % 4) AS BIGINT) AS n_latin,
                 CAST((3 * doc_id) % 7 AS BIGINT) AS n_cyrillic,
                 CAST((7 * doc_id) % 4 AS BIGINT) AS n_greek,
                 CAST(doc_id % 5 AS BIGINT) AS n_arabic,
                 CAST((5 * doc_id) % 6 AS BIGINT) AS n_cjk
          FROM range(0, 120) r(doc_id))
        SELECT doc_id, n_latin, n_cyrillic, n_greek, n_arabic, n_cjk,
               CASE
                 WHEN n_latin > 0 AND n_latin >= greatest(n_cyrillic, n_greek,
                      n_arabic, n_cjk) THEN 'latin'
                 WHEN n_cyrillic > 0 AND n_cyrillic >= greatest(n_latin,
                      n_greek, n_arabic, n_cjk) THEN 'cyrillic'
                 WHEN n_greek > 0 AND n_greek >= greatest(n_latin, n_cyrillic,
                      n_arabic, n_cjk) THEN 'greek'
                 WHEN n_arabic > 0 AND n_arabic >= greatest(n_latin,
                      n_cyrillic, n_greek, n_cjk) THEN 'arabic'
                 WHEN n_cjk > 0 AND n_cjk >= greatest(n_latin, n_cyrillic,
                      n_greek, n_arabic) THEN 'cjk'
                 ELSE 'none' END AS main_script
        FROM c
    """
    o["rss_atom_entries"] = """
        WITH hosts AS (SELECT unnest(range(0, 10)) AS h),
        e AS (SELECT h, unnest(range(0, 4 + h % 3)) AS j FROM hosts)
        SELECT 'feed' || h || '.example.org' AS host,
               'https://feed' || h || '.example.org/post/' || (h * 10 + j)
                 AS link,
               CASE WHEN j % 3 = 2 THEN 'Post ' || (h * 10 + j) || ' & more'
                    ELSE 'Post ' || (h * 10 + j) END AS title,
               '2026-' || lpad(CAST(1 + (h + j) % 12 AS VARCHAR), 2, '0')
                 || '-' || lpad(CAST(1 + (h * 7 + j) % 28 AS VARCHAR), 2, '0')
                 AS pub_day,
               CASE WHEN h % 2 = 1 THEN 'atom' ELSE 'rss' END AS feed_type
        FROM e
    """
    o["jsonld_triples"] = (
        _structured_facts_sql() + "SELECT src_url, subj, pred, obj FROM ld"
    )
    o["meta_og_cards"] = _structured_facts_sql() + """
        SELECT src_url AS url,
               'Entity' || a || ' overview' AS title,
               'Entity' || a AS og_title,
               og_type,
               'Profile of Entity' || a || ' number ' || i || '.' AS description
        FROM f
    """
    o["infobox_triples"] = (
        _structured_facts_sql() + "SELECT src_url, subj, pred, obj FROM box"
    )
    o["data_table_triples"] = _structured_facts_sql() + """
        SELECT src_url, 'Widget' || ((2 * i + 1) % 19) AS subj,
               'table:region' AS pred, 'Region' || (i % 5) AS obj FROM f
        UNION ALL
        SELECT src_url, 'Widget' || ((2 * i + 1) % 19), 'table:units_sold',
               CAST((11 * i) % 900 + 5 AS VARCHAR) FROM f
        UNION ALL
        SELECT src_url, 'Gadget' || ((4 * i + 3) % 19), 'table:region',
               'Region' || ((i + 2) % 5) FROM f WHERE i % 7 <> 1
        UNION ALL
        SELECT src_url, 'Gadget' || ((4 * i + 3) % 19), 'table:units_sold',
               CAST((13 * i) % 900 + 7 AS VARCHAR) FROM f
    """
    o["structured_entity_stats"] = _structured_facts_sql() + """
        , u AS (
          SELECT src_url, subj, 'jsonld' AS src FROM ld
          UNION ALL SELECT src_url, subj, 'infobox' AS src FROM box)
        SELECT subj, COUNT(*) AS n_facts,
               COUNT(DISTINCT src_url) AS n_pages,
               COUNT(DISTINCT src) AS n_sources
        FROM u GROUP BY subj
    """

    o["link_extract_canonical"] = _linked_links_sql()
    o["host_graph_edges"] = f"""
        WITH l AS ({_linked_links_sql()}),
        h AS (
          SELECT regexp_extract(src_url, '^[a-z]+://([^/:?#]*)', 1) AS src_host,
                 regexp_extract(dst_url, '^[a-z]+://([^/:?#]*)', 1) AS dst_host
          FROM l)
        SELECT src_host, dst_host, CAST(count(*) AS BIGINT) AS n_links
        FROM h WHERE src_host <> dst_host GROUP BY src_host, dst_host
    """
    o["host_pagerank_5"] = _pagerank_sql(
        iterations=5, damping=0.85, edges_sql=_host_edges_sql()
    )
    o["host_hits_5"] = _hits_sql(iterations=5, edges_sql=_host_edges_sql())
    o["host_harmonic_centrality"] = (
        "\n".join(_minhop_parts(_host_edges_sql(), 6)).rstrip(",")
        + """
        SELECT dst AS node, CAST(sum(1000000 // d) AS BIGINT) AS harmonic_i,
               CAST(count(*) AS BIGINT) AS n_reach
        FROM d6 WHERE src <> dst GROUP BY dst
    """
    )
    o["host_eccentricity"] = (
        "\n".join(_minhop_parts(_host_edges_sql(), 6)).rstrip(",")
        + """
        SELECT src AS node, CAST(max(d) AS BIGINT) AS ecc,
               CAST(count(*) AS BIGINT) AS n_reach
        FROM d6 WHERE src <> dst GROUP BY src
    """
    )
    o["host_stress_centrality"] = _stress_sql(_host_edges_sql(), 6)
    o["host_anf_hyperball"] = (
        "\n".join(_minhop_parts(_host_edges_sql(), 4)).rstrip(",")
        + """
        , nodes AS (SELECT src AS node FROM edges UNION SELECT dst FROM edges)
        SELECT n.node, CAST(rr.r AS BIGINT) AS r,
               CAST(1 + (SELECT count(DISTINCT d4.dst) FROM d4
                         WHERE d4.src = n.node AND d4.d <= rr.r
                           AND d4.dst <> n.node) AS BIGINT) AS ball_i
        FROM nodes n CROSS JOIN (VALUES (1), (2), (3), (4)) rr(r)
    """
    )
    o["host_trustrank_seeded"] = _trustrank_sql(
        _TRUST_SEED_HOSTS, iterations=5, damping=0.85, edges_sql=_host_edges_sql()
    )
    o["host_spam_mass"] = f"""
        WITH p AS MATERIALIZED (
          {_pagerank_sql(iterations=5, damping=0.85,
                         edges_sql=_host_edges_sql(), raw=True)}),
        t AS MATERIALIZED (
          {_trustrank_sql(_TRUST_SEED_HOSTS, iterations=5, damping=0.85,
                          edges_sql=_host_edges_sql(), raw=True)})
        SELECT coalesce(p.node, t.node) AS node,
               CAST(round(1000000 * coalesce(p.pr, 0)) AS BIGINT) AS pr_i,
               CAST(round(1000000 * coalesce(t.pr, 0)) AS BIGINT) AS tr_i,
               CAST(round(1000000 * (coalesce(p.pr, 0) - coalesce(t.pr, 0)))
                    AS BIGINT) AS mass_i,
               CAST(CASE WHEN p.node IS NULL THEN -1
                    ELSE round(1000000 * (p.pr - coalesce(t.pr, 0)) / p.pr)
                    END AS BIGINT) AS rel_i
        FROM p FULL OUTER JOIN t ON t.node = p.node
    """
    o["host_link_reciprocity"] = f"""
        WITH e AS MATERIALIZED (
          SELECT DISTINCT src, dst FROM ({_host_edges_sql()}) WHERE src <> dst)
        SELECT e.src AS host,
               CAST(count(*) AS BIGINT) AS n_out,
               CAST(sum(CASE WHEN r.src IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_reciprocal,
               CAST((1000000 * sum(CASE WHEN r.src IS NOT NULL THEN 1 ELSE 0 END))
                    // count(*) AS BIGINT) AS reciprocity_i
        FROM e LEFT JOIN e r ON r.src = e.dst AND r.dst = e.src
        GROUP BY e.src
    """
    o["kcore_peel"] = _kcore_sql(k=2, rounds=8)
    o["web_bowtie_structure"] = "\nUNION ALL ".join(
        f"SELECT '{n}' AS node, '{cls}' AS cls"
        for cls, members in _BOWTIE_EXPECTED.items()
        for n in members
    )
    # hand-derived condensation of the bowtie fixture: (scc_id, size, level)
    o["kg_condensation"] = "\nUNION ALL ".join(
        f"SELECT '{cid}' AS scc_id, CAST({n} AS BIGINT) AS n_members,"
        f" CAST({lvl} AS BIGINT) AS level"
        for cid, n, lvl in [
            ("c0", 4, 2), ("o2", 2, 3), ("d0", 2, 0),
            ("i1", 1, 0), ("i0", 1, 1), ("t0", 1, 2), ("t3", 1, 3),
            ("t1", 1, 0), ("o0", 1, 3), ("o1", 1, 4),
            ("d2", 1, 0), ("d3", 1, 1),
        ]
    )
    o["bloom_prefilter_dedup"] = """
        WITH delta AS MATERIALIZED (
          SELECT DISTINCT md5(text) AS dg FROM documents WHERE doc_id % 10 = 0),
        pos AS MATERIALIZED (
          SELECT DISTINCT
                 ('0x' || substr(md5(dg || ':' || j), 1, 8))::BIGINT % 4096 AS p
          FROM delta CROSS JOIN (SELECT unnest(['0', '1', '2']) AS j)),
        store AS (SELECT doc_id, md5(text) AS dg FROM documents)
        SELECT s.doc_id,
               CAST(CASE WHEN
                 EXISTS (SELECT 1 FROM pos WHERE p =
                   ('0x' || substr(md5(s.dg || ':0'), 1, 8))::BIGINT % 4096)
                 AND EXISTS (SELECT 1 FROM pos WHERE p =
                   ('0x' || substr(md5(s.dg || ':1'), 1, 8))::BIGINT % 4096)
                 AND EXISTS (SELECT 1 FROM pos WHERE p =
                   ('0x' || substr(md5(s.dg || ':2'), 1, 8))::BIGINT % 4096)
               THEN 1 ELSE 0 END AS BIGINT) AS bloom_pass_i,
               CAST(CASE WHEN EXISTS (SELECT 1 FROM delta d WHERE d.dg = s.dg)
                    THEN 1 ELSE 0 END AS BIGINT) AS true_dup_i
        FROM store s
    """
    o["dedup_span_removal"] = f"""
        WITH d AS (
          SELECT doc_id,
                 text || CASE WHEN doc_id % 3 = 0
                              THEN '{_DUP_SPAN_SENTENCE}' ELSE '' END AS text
          FROM documents),
        toks AS (
          SELECT doc_id,
                 list_filter(regexp_split_to_array(lower(trim(text)), '\\s+'),
                             t -> t <> '') AS arr
          FROM d),
        grams AS MATERIALIZED (
          SELECT doc_id, i, array_to_string(arr[i : i + 4], ' ') AS gram
          FROM toks,
               LATERAL (SELECT unnest(generate_series(1, len(arr) - 4)) AS i) g
          WHERE len(arr) >= 5),
        dup AS MATERIALIZED (
          SELECT gram FROM grams GROUP BY gram
          HAVING count(DISTINCT doc_id) >= 2),
        starts AS (SELECT g.doc_id, g.i FROM grams g JOIN dup USING (gram)),
        pos AS (
          SELECT t.doc_id, p.pos, t.arr[p.pos] AS tok
          FROM toks t,
               LATERAL (SELECT unnest(generate_series(1, len(t.arr))) AS pos) p
          WHERE len(t.arr) >= 1),
        kept AS (
          SELECT o.doc_id, o.pos, o.tok FROM pos o
          WHERE NOT EXISTS (
            SELECT 1 FROM starts s
            WHERE s.doc_id = o.doc_id AND o.pos BETWEEN s.i AND s.i + 4)),
        agg AS (
          SELECT doc_id, CAST(count(*) AS BIGINT) AS n_kept,
                 string_agg(tok, ' ' ORDER BY pos) AS cleaned
          FROM kept GROUP BY doc_id)
        SELECT t.doc_id,
               CAST(len(t.arr) AS BIGINT) AS n_tokens,
               CAST(len(t.arr) - coalesce(a.n_kept, 0) AS BIGINT) AS n_removed,
               coalesce(a.cleaned, '') AS cleaned_text
        FROM toks t LEFT JOIN agg a USING (doc_id)
    """
    o["duplicate_ngram_spans"] = f"""
        WITH d AS (
          SELECT doc_id,
                 text || CASE WHEN doc_id % 3 = 0
                              THEN '{_DUP_SPAN_SENTENCE}' ELSE '' END AS text
          FROM documents),
        toks AS (
          SELECT doc_id,
                 list_filter(regexp_split_to_array(lower(trim(text)), '\\s+'),
                             t -> t <> '') AS arr
          FROM d),
        grams AS MATERIALIZED (
          SELECT doc_id, array_to_string(arr[i : i + 4], ' ') AS gram
          FROM toks,
               LATERAL (SELECT unnest(generate_series(1, len(arr) - 4)) AS i) g
          WHERE len(arr) >= 5),
        dup AS MATERIALIZED (
          SELECT gram FROM grams GROUP BY gram
          HAVING count(DISTINCT doc_id) >= 2),
        per_doc AS (
          SELECT g.doc_id, CAST(count(*) AS BIGINT) AS n_grams,
                 CAST(sum(CASE WHEN u.gram IS NOT NULL THEN 1 ELSE 0 END)
                      AS BIGINT) AS n_dup
          FROM grams g LEFT JOIN dup u ON u.gram = g.gram
          GROUP BY g.doc_id)
        SELECT d.doc_id,
               coalesce(p.n_grams, 0) AS n_grams,
               coalesce(p.n_dup, 0) AS n_dup,
               CASE WHEN coalesce(p.n_grams, 0) > 0
                    THEN CAST(round(10000.0 * p.n_dup / p.n_grams) AS BIGINT)
                    ELSE 0 END AS dup_frac_i
        FROM documents d LEFT JOIN per_doc p ON p.doc_id = d.doc_id
    """
    o["host_random_walks"] = _walks_sql(4, _host_edges_sql())
    _csv_path = _ensure_csv_corpus()
    o["csv_roundtrip"] = f"""
        SELECT doc_id, lang,
               CAST(length(text) AS BIGINT) AS n_chars,
               md5(text) AS text_md5
        FROM read_csv('{_csv_path}', header = true,
                      columns = {{'doc_id': 'BIGINT', 'lang': 'VARCHAR',
                                  'text': 'VARCHAR'}},
                      ignore_errors = true)
        WHERE doc_id IS NOT NULL
    """
    _jsonl_path = _ensure_jsonl_corpus()
    o["jsonl_roundtrip"] = f"""
        SELECT doc_id, lang,
               CAST(length(text) AS BIGINT) AS n_chars,
               md5(text) AS text_md5
        FROM read_json('{_jsonl_path}', format = 'newline_delimited',
                       columns = {{'doc_id': 'BIGINT', 'lang': 'VARCHAR',
                                   'text': 'VARCHAR'}},
                       ignore_errors = true)
        WHERE doc_id IS NOT NULL
    """
    _lk_path = _ensure_link_corpus()
    o["hll_distinct_tokens"] = r"""
        WITH toks AS (
          SELECT lang, tok FROM (
            SELECT lang,
                   unnest(regexp_split_to_array(lower(text), '\s+')) AS tok
            FROM documents) WHERE tok <> '')
        SELECT lang,
               CAST(count(DISTINCT tok) AS BIGINT) AS exact_distinct_l,
               CAST(1 AS INT) AS within_tol_i
        FROM toks GROUP BY lang
    """
    _cs_path = _ensure_charset_corpus()
    o["charset_detect_decode"] = f"""
        WITH ids AS (
          SELECT doc_id FROM read_parquet('{_cs_path}')
        ),
        b AS (
          SELECT doc_id, doc_id % 4 AS k,
                 'charset doc ' || doc_id || ' na' || chr(239) || 've caf'
                   || chr(233) || ' r' || chr(233) || 'sum' || chr(233)
                   || ' ' || (doc_id * 3) AS body
          FROM ids
        ),
        t AS (
          SELECT doc_id, k,
                 CASE k
                   WHEN 0 THEN '<meta charset="utf-8"><p>' || body
                   WHEN 1 THEN '<p>' || body
                   WHEN 2 THEN '<meta http-equiv="Content-Type"'
                     || ' content="text/html; charset=windows-1252"><p>'
                     || body
                   ELSE '<p>' || body
                 END AS text
          FROM b
        )
        SELECT doc_id,
               CASE k WHEN 2 THEN 'windows-1252'
                      WHEN 3 THEN 'utf-16le'
                      ELSE 'utf-8' END AS charset,
               CAST(CASE WHEN k IN (1, 3) THEN 1 ELSE 0 END AS INT) AS bom_i,
               md5(text) AS text_md5,
               CAST(length(text) AS BIGINT) AS n_chars
        FROM t
    """
    _wav_path = _ensure_wav_corpus()
    o["wav_audio_features"] = f"""
        WITH ids AS (
          SELECT media_id,
                 CASE WHEN regexp_matches(media_id, '^wav\\d+$')
                      THEN CAST(regexp_extract(media_id, '^wav(\\d+)$', 1)
                                AS BIGINT)
                 END AS i
          FROM read_parquet('{_wav_path}')
        ),
        d AS (
          SELECT media_id, i,
                 2 + i % 5 AS h, 20 + i % 7 AS blocks,
                 500 + 25 * i AS a, 8000 * (1 + i % 3) AS rate
          FROM ids
        )
        SELECT media_id,
               CAST(rate AS INT) AS sample_rate_i,
               CAST(1 + i % 2 AS INT) AS n_channels_i,
               CAST(h * blocks AS BIGINT) AS n_frames_l,
               CAST(h * blocks * a * a AS BIGINT) AS sum_sq_l,
               CAST(blocks - 1 AS BIGINT) AS n_zero_cross_l,
               CAST((h * blocks * 1000) // rate AS INT) AS duration_ms_i
        FROM d WHERE i IS NOT NULL
    """
    _incr_sig_list = ", ".join(f"mh{i}" for i in range(16))
    o["minhash_incremental_delta"] = (
        "WITH "
        + _minhash_cte()
        + f""",
        sigl AS (SELECT id, list_value({_incr_sig_list}) AS sl FROM sig),
        candi AS (
          SELECT DISTINCT l.id AS a, r.id AS b
          FROM banded l JOIN banded r
            ON l.band = r.band AND l.bhash = r.bhash AND l.id < r.id
        ),
        m AS (
          SELECT c.a, c.b,
                 len(list_filter(generate_series(1, 16),
                                 i -> la.sl[i] = lb.sl[i])) AS nm
          FROM candi c
          JOIN sigl la ON la.id = c.a
          JOIN sigl lb ON lb.id = c.b
        )
        SELECT a, b, CAST(nm AS INT) AS n_match_i
        FROM m WHERE nm >= 8 AND b >= 10000
    """
    )
    _cdx_path = _ensure_cdx_fixture()
    o["cdx_fetch_list"] = f"""
        WITH p AS (
          SELECT regexp_extract(line, '^(\\S+) (\\d{{14}}) (\\{{.*\\}})$', 1)
                   AS surt,
                 regexp_extract(line, '^(\\S+) (\\d{{14}}) (\\{{.*\\}})$', 2)
                   AS ts,
                 nullif(regexp_extract(line,
                   '^(\\S+) (\\d{{14}}) (\\{{.*\\}})$', 3), '') AS j
          FROM read_csv('{_cdx_path}', columns = {{'line': 'VARCHAR'}},
                        delim = chr(1), quote = '', header = false)
        ),
        t AS (
          SELECT surt, ts,
                 json_extract_string(j, '$.url') AS url,
                 json_extract_string(j, '$.mime') AS mime,
                 json_extract_string(j, '$.status') AS status,
                 json_extract_string(j, '$.digest') AS digest,
                 CAST(json_extract_string(j, '$.length') AS BIGINT) AS length_l,
                 CAST(json_extract_string(j, '$.offset') AS BIGINT) AS offset_l,
                 json_extract_string(j, '$.filename') AS filename
          FROM p
          WHERE surt <> '' AND j IS NOT NULL AND json_valid(j)
            AND json_extract_string(j, '$.url') IS NOT NULL
        ),
        f AS (
          SELECT * FROM t WHERE status = '200' AND mime = 'text/html'
        ),
        r AS (
          SELECT *, row_number() OVER (
                   PARTITION BY digest
                   ORDER BY ts, url, surt, filename, offset_l, length_l
                 ) AS rn
          FROM f
        ),
        best AS (SELECT * FROM r WHERE rn = 1),
        surted AS (
          SELECT *,
            lower(regexp_extract(url,
              '^[a-zA-Z][a-zA-Z0-9+.-]*://([^/:?#]+)', 1)) AS u_host,
            CASE WHEN regexp_extract(url,
                   '^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]+(/[^?#]*)', 1) = ''
                 THEN '/'
                 ELSE lower(regexp_extract(url,
                   '^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]+(/[^?#]*)', 1))
            END AS u_path
          FROM best
        )
        SELECT digest, ts, surt, url, filename, offset_l, length_l,
               CAST(surt = array_to_string(
                      list_reverse(string_split(u_host, '.')), ',')
                    || ')' || u_path AS INT) AS surt_match_i
        FROM surted
    """
    o["dsir_importance_weights"] = r"""
        WITH rt AS (
          SELECT doc_id, tok,
                 ('0x' || substr(md5(tok), 1, 8))::BIGINT % 4096 AS bucket
          FROM (SELECT doc_id,
                       unnest(regexp_split_to_array(lower(text), '\s+')) AS tok
                FROM documents)
          WHERE tok <> ''),
        tt AS (
          SELECT tok,
                 ('0x' || substr(md5(tok), 1, 8))::BIGINT % 4096 AS bucket
          FROM (SELECT unnest(regexp_split_to_array(lower(text), '\s+')) AS tok
                FROM documents WHERE doc_id % 5 = 0)
          WHERE tok <> ''),
        rc AS (SELECT bucket, count(*) AS cnt_r FROM rt GROUP BY bucket),
        tc AS (SELECT bucket, count(*) AS cnt_t FROM tt GROUP BY bucket),
        rtot AS (SELECT sum(cnt_r) AS total_r FROM rc),
        ttot AS (SELECT sum(cnt_t) AS total_t FROM tc),
        bk AS (
          SELECT coalesce(rc.bucket, tc.bucket) AS bucket,
                 coalesce(cnt_r, 0) AS cnt_r,
                 coalesce(cnt_t, 0) AS cnt_t
          FROM rc FULL OUTER JOIN tc ON rc.bucket = tc.bucket),
        lr AS (
          SELECT bucket,
                 CAST(round(1000000 * (
                       ln(cnt_t + 1.0)
                     - ln((SELECT total_t FROM ttot) + 4096.0)
                     - ln(cnt_r + 1.0)
                     + ln((SELECT total_r FROM rtot) + 4096.0)))
                   AS BIGINT) AS lr_i
          FROM bk)
        SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
               CAST(sum(lr_i) AS BIGINT) AS weight_i
        FROM rt JOIN lr USING (bucket) GROUP BY doc_id
    """
    _sm_dir = _ensure_sitemap_corpus()
    o["sitemap_frontier_diff"] = f"""
        WITH blocks AS (
          SELECT host,
                 unnest(regexp_extract_all(sitemap_xml,
                   '(?s)<url\\s*>.*?</url\\s*>')) AS block
          FROM read_parquet('{_sm_dir}/sitemaps.parquet')
        ),
        entries AS (
          SELECT host,
                 regexp_extract(block,
                   '(?s)<loc\\s*>\\s*([^<]*?)\\s*</loc\\s*>', 1) AS loc,
                 nullif(regexp_extract(block,
                   '(?s)<lastmod\\s*>\\s*(\\d{{4}}-\\d{{2}}-\\d{{2}})', 1), '')
                   AS lastmod_day
          FROM blocks
        ),
        good AS (SELECT * FROM entries WHERE loc <> '')
        SELECT g.host,
               g.loc AS url,
               g.lastmod_day,
               s.last_crawl_day,
               CASE
                 WHEN s.url IS NULL THEN 'new'
                 WHEN g.lastmod_day IS NULL THEN 'unknown'
                 WHEN g.lastmod_day > s.last_crawl_day THEN 'stale'
                 ELSE 'fresh'
               END AS status
        FROM good g
        LEFT JOIN read_parquet('{_sm_dir}/crawlstate.parquet') s
          ON s.url = g.loc
    """
    _rb_dir = _ensure_robots_corpus()
    o["robots_txt_fetch_policy"] = f"""
        WITH raw AS (
          SELECT host, string_split(robots_txt, chr(10)) AS ls
          FROM read_parquet('{_rb_dir}/robots.parquet')
        ),
        lines AS (
          SELECT host, unnest(range(1, len(ls) + 1)) AS i, unnest(ls) AS ln
          FROM raw
        ),
        parsed AS (
          SELECT host, i,
                 lower(regexp_extract(ln,
                   '(?i)^[ \t]*(user-agent|allow|disallow)[ \t]*:', 1)) AS directive,
                 trim(regexp_replace(regexp_extract(ln,
                   '(?i)^[ \t]*(?:user-agent|allow|disallow)[ \t]*:(.*)$', 1),
                   '[ \t]*#.*$', '')) AS value
          FROM lines
        ),
        g1 AS (
          SELECT *, (directive = 'user-agent') AS is_ua
          FROM parsed WHERE directive <> ''
        ),
        g2 AS (
          SELECT *, is_ua AND NOT coalesce(
                   lag(is_ua) OVER (PARTITION BY host ORDER BY i), false)
                 AS new_group
          FROM g1
        ),
        g AS (
          SELECT * FROM (
            SELECT *, sum(CASE WHEN new_group THEN 1 ELSE 0 END)
                   OVER (PARTITION BY host ORDER BY i ROWS UNBOUNDED PRECEDING)
                   AS gid
            FROM g2
          ) WHERE gid > 0
        ),
        agents AS (
          SELECT host, gid,
                 max(CASE WHEN lower(value) = 'aiwhisprbot' THEN 1 ELSE 0 END)
                   AS applies_specific,
                 max(CASE WHEN value = '*' THEN 1 ELSE 0 END) AS applies_star
          FROM g WHERE is_ua GROUP BY host, gid
        ),
        rules AS (
          SELECT host, gid, directive AS rule, value AS prefix,
                 length(value) AS plen
          FROM g
          WHERE NOT is_ua AND value <> ''
            AND NOT regexp_matches(value, '[*$]')
        ),
        host_has AS (
          SELECT host, max(applies_specific) AS has_specific
          FROM agents GROUP BY host
        ),
        applicable AS (
          SELECT r.host, r.rule, r.prefix, r.plen
          FROM rules r
          JOIN agents a ON a.host = r.host AND a.gid = r.gid
          JOIN host_has h ON h.host = r.host
          WHERE (h.has_specific = 1 AND a.applies_specific = 1)
             OR (h.has_specific = 0 AND a.applies_star = 1)
        ),
        u AS (
          SELECT url,
                 lower(regexp_extract(url,
                   '^[a-zA-Z][a-zA-Z0-9+.-]*://([^/:?#]+)', 1)) AS host,
                 CASE WHEN regexp_extract(url,
                        '^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]+(/[^?#]*)', 1) = ''
                      THEN '/'
                      ELSE regexp_extract(url,
                        '^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]+(/[^?#]*)', 1)
                 END AS path
          FROM read_parquet('{_rb_dir}/urls.parquet')
        ),
        hits AS (
          SELECT uu.url, a.rule, a.prefix,
                 row_number() OVER (
                   PARTITION BY uu.url
                   ORDER BY a.plen DESC, (a.rule = 'allow') DESC, a.prefix DESC
                 ) AS rn
          FROM u uu
          JOIN applicable a
            ON a.host = uu.host AND starts_with(uu.path, a.prefix)
        )
        SELECT uu.url,
               CASE WHEN h.url IS NULL THEN 1
                    WHEN h.rule = 'allow' THEN 1 ELSE 0 END AS allowed_i,
               h.prefix AS match_prefix
        FROM u uu
        LEFT JOIN (SELECT * FROM hits WHERE rn = 1) h ON h.url = uu.url
    """
    _uni_path = _ensure_unicode_corpus()
    o["unicode_nfc_normalize"] = f"""
        SELECT doc_id,
               md5(nfc_normalize(text)) AS nfc_md5,
               CAST(nfc_normalize(text) <> text AS INT) AS changed_i,
               CAST(length(nfc_normalize(text)) AS BIGINT) AS n_chars_nfc
        FROM read_parquet('{_uni_path}')
    """
    o["crawl_schedule_priority"] = f"""
        WITH pr AS MATERIALIZED (
          {_pagerank_sql(iterations=5, damping=0.85, edges_sql=_host_edges_sql())}
        ),
        ch AS MATERIALIZED (
          SELECT 'https://host' || (i % 12) || '.example.org/a/' || i AS canon_url,
                 'host' || (i % 12) || '.example.org' AS host,
                 CASE WHEN i % 4 = 0 THEN 2 ELSE 0 END AS n_changes
          FROM (SELECT CAST(regexp_extract(url, 'a/(\\d+)$', 1) AS BIGINT) AS i
                FROM read_parquet('{_lk_path}'))
        )
        SELECT c.canon_url,
               CAST(p.pr_i * (c.n_changes + 1) AS BIGINT) AS priority_i
        FROM ch c JOIN pr p ON p.node = c.host
        ORDER BY priority_i DESC, c.canon_url ASC
        LIMIT 30
    """
    _sx_names = ", ".join(
        "('" + n.replace("'", "''") + "')"
        for n in [
            "Smith", "Smyth", "Smythe", "Schmidt", "Schmitt", "Johnson",
            "Jonson", "Johnston", "Ashcraft", "Ashcroft", "Tymczak",
            "Pfister", "Honeyman", "Lee", "Leigh", "Lea", "VanDeusen",
            "Washington", "Gutierrez", "Robert", "Rupert", "Rubin",
            "Jackson", "Jaxon", "Meyer", "Maier", "Mayr", "Miller",
            "Mueller", "OBrien", "O'Brien", "Wu", "Woo",
        ]
    )
    _sx_d = (
        "translate(regexp_replace(u, '[HW]', '', 'g'),"
        " 'AEIOUYBFPVCGJKQSXZDTLMNR', '000000111122222222334556')"
    )
    for _dig in "0123456":
        _sx_d = f"regexp_replace({_sx_d}, '{_dig}{_dig}+', '{_dig}', 'g')"
    o["soundex_blocking"] = f"""
        WITH names AS (SELECT DISTINCT name
                       FROM (VALUES {_sx_names}) n(name)),
        pre AS (
          SELECT name, regexp_replace(upper(name), '[^A-Z]', '', 'g') AS u
          FROM names
        ),
        coded AS (
          SELECT name, u, substr(u, 1, 1) AS f, {_sx_d} AS d
          FROM pre
        ),
        sx AS (
          SELECT name,
                 CASE WHEN u = '' THEN '' ELSE
                   f || rpad(substr(replace(
                     CASE WHEN f IN ('H', 'W') THEN d ELSE substr(d, 2) END,
                     '0', ''), 1, 3), 3, '0')
                 END AS soundex
          FROM coded
        )
        SELECT soundex, CAST(count(*) AS BIGINT) AS n_names,
               string_agg(name, ',' ORDER BY name) AS members
        FROM sx GROUP BY soundex HAVING count(*) >= 2
        ORDER BY soundex
    """
    o["column_encoding_stats"] = """
        WITH keyed AS (
          SELECT l_orderkey * 8 + l_linenumber AS sk,
                 CAST(l_returnflag AS VARCHAR) AS c1,
                 CAST(l_linestatus AS VARCHAR) AS c2,
                 CAST(l_quantity AS VARCHAR) AS c3
          FROM lineitem
        ),
        longf AS (
          SELECT sk, 'l_returnflag' AS col, coalesce(c1, '') AS v FROM keyed
          UNION ALL
          SELECT sk, 'l_linestatus', coalesce(c2, '') FROM keyed
          UNION ALL
          SELECT sk, 'l_quantity', coalesce(c3, '') FROM keyed
        ),
        runs AS (
          SELECT col, v,
                 CASE WHEN v IS DISTINCT FROM
                        lag(v) OVER (PARTITION BY col, sk // 4096
                                     ORDER BY sk, v)
                      THEN 1 ELSE 0 END AS is_run_start
          FROM longf
        ),
        agg AS (
          SELECT col AS "column",
                 CAST(count(*) AS BIGINT) AS n_rows,
                 CAST(count(DISTINCT v) AS BIGINT) AS n_distinct,
                 CAST(sum(is_run_start) AS BIGINT) AS n_runs,
                 CAST(sum(length(v) + 4) AS BIGINT) AS plain_b,
                 CAST(sum(CASE WHEN is_run_start = 1
                          THEN length(v) + 8 ELSE 0 END) AS BIGINT) AS rle_b
          FROM runs GROUP BY 1
        ),
        dictp AS (
          SELECT col AS "column",
                 CAST(sum(length(v) + 4) AS BIGINT) AS dict_payload
          FROM (SELECT DISTINCT col, v FROM longf) GROUP BY 1
        ),
        final AS (
          SELECT a."column", n_rows, n_distinct, n_runs, plain_b,
                 CAST(dict_payload +
                      (n_rows * greatest(length(bin(n_distinct - 1)), 1) + 7)
                      // 8 AS BIGINT) AS dict_b,
                 rle_b
          FROM agg a JOIN dictp d ON a."column" = d."column"
        )
        SELECT "column", n_rows, n_distinct, n_runs, plain_b, dict_b, rle_b,
               CASE WHEN plain_b <= dict_b AND plain_b <= rle_b THEN 'plain'
                    WHEN dict_b <= rle_b THEN 'dict' ELSE 'rle' END AS best
        FROM final ORDER BY "column"
    """
    o["topk_incremental_merge"] = """
        SELECT l_orderkey, l_linenumber,
               CAST(round(l_extendedprice * 100) AS BIGINT) AS price_ci
        FROM lineitem
        ORDER BY price_ci DESC, l_orderkey, l_linenumber
        LIMIT 20
    """
    o["pdf_text_cleanup"] = """
        WITH base AS (
          SELECT doc_id AS id, CAST(doc_id % 3 + 1 AS INTEGER) AS reps
          FROM documents
        ),
        built AS (
          SELECT id, reps,
                 repeat('eﬃcient ﬂow compu-' || chr(10) ||
                        'tation num-' || chr(10) || 'ber ', reps)
                   || 'the ﬁnal line' AS t
          FROM base
        ),
        expanded AS (
          SELECT id, reps,
                 replace(replace(replace(t, 'ﬃ', 'ffi'),
                         'ﬂ', 'fl'), 'ﬁ', 'fi') AS t2,
                 CAST(2 * reps + 1 AS BIGINT) AS n_ligatures
          FROM built
        ),
        rejoined AS (
          SELECT id, n_ligatures,
                 CAST(2 * reps AS BIGINT) AS n_rejoins,
                 regexp_replace(t2, '([a-z])-\\s*\\n\\s*([a-z])', '\\1\\2', 'g')
                   AS t3
          FROM expanded
        )
        SELECT id,
               trim(regexp_replace(t3, '\\s+', ' ', 'g')) AS clean_text,
               n_ligatures, n_rejoins
        FROM rejoined ORDER BY id
    """
    _gh_chars = []
    for _c in range(7):
        _bits = []
        for _k in range(5):
            _j = 5 * _c + _k
            _q = "lngq" if _j % 2 == 0 else "latq"
            _idx = _j // 2
            _bits.append(f"(({_q} >> {29 - _idx}) & 1)")
        _v = " + ".join(
            f"{b} * {1 << (4 - i)}" for i, b in enumerate(_bits)
        )
        _gh_chars.append(
            f"substr('0123456789bcdefghjkmnpqrstuvwxyz', CAST({_v} AS INTEGER) + 1, 1)"
        )
    o["geohash_encode"] = f"""
        WITH base AS (
          SELECT doc_id,
                 CAST((doc_id * 7919) % 1800000001 - 900000000 AS BIGINT)
                   AS lat_e7,
                 CAST((doc_id * 104729) % 3600000001 - 1800000000 AS BIGINT)
                   AS lng_e7
          FROM documents
        ),
        q AS (
          SELECT doc_id, lat_e7, lng_e7,
                 (lat_e7 + 900000000) * 1073741824 // 1800000000 AS latq,
                 (lng_e7 + 1800000000) * 1073741824 // 3600000000 AS lngq
          FROM base
        ),
        gh AS (
          SELECT doc_id, lat_e7, lng_e7,
                 {" || ".join(_gh_chars)} AS geohash
          FROM q
        )
        SELECT doc_id, lat_e7, lng_e7, geohash,
               substr(geohash, 1, 4) AS cell4
        FROM gh ORDER BY doc_id
    """
    o["kg_distmult_score"] = """
        WITH t AS (
          SELECT DISTINCT
                 'Entity_' || (doc_id % 40) AS subj,
                 CASE doc_id % 3 WHEN 0 THEN 'founded'
                                 WHEN 1 THEN 'acquired'
                                 ELSE 'based_in' END AS pred,
                 'Entity_' || ((doc_id * 7 + 1) % 40) AS obj
          FROM documents)
        SELECT subj, pred, obj,
               CAST(list_aggregate(list_transform(range(0, 16), i ->
                   ((('0x' || substr(md5(subj || ':' || i), 1, 8))::BIGINT
                     % 2001) - 1000)
                 * ((('0x' || substr(md5('rel:' || pred || ':' || i), 1, 8))::BIGINT
                     % 2001) - 1000)
                 * ((('0x' || substr(md5(obj || ':' || i), 1, 8))::BIGINT
                     % 2001) - 1000)), 'sum') AS BIGINT) AS score_i
        FROM t
    """
    o["kg_transe_score"] = """
        WITH t AS (
          SELECT DISTINCT
                 'Entity_' || (doc_id % 40) AS subj,
                 CASE doc_id % 3 WHEN 0 THEN 'founded'
                                 WHEN 1 THEN 'acquired'
                                 ELSE 'based_in' END AS pred,
                 'Entity_' || ((doc_id * 7 + 1) % 40) AS obj
          FROM documents)
        SELECT subj, pred, obj,
               CAST(list_aggregate(list_transform(range(0, 16), i -> abs(
                   ((('0x' || substr(md5(subj || ':' || i), 1, 8))::BIGINT
                     % 2001) - 1000)
                 + ((('0x' || substr(md5('rel:' || pred || ':' || i), 1, 8))::BIGINT
                     % 2001) - 1000)
                 - ((('0x' || substr(md5(obj || ':' || i), 1, 8))::BIGINT
                     % 2001) - 1000))), 'sum') AS BIGINT) AS energy_i
        FROM t
    """
    o["paragraph_dedup"] = """
        SELECT doc_id,
               md5('Body paragraph number ' || doc_id
                   || ' with distinct content') AS clean_md5,
               CAST(1 AS BIGINT) AS n_kept,
               CAST(CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 0 END AS BIGINT)
                 AS n_dropped
        FROM documents
    """
    o["bpe_pair_stats"] = r"""
        WITH wx AS (
          SELECT unnest(list_filter(
                   regexp_split_to_array(lower(trim(text)), '\s+'),
                   t -> t <> '')) AS w
          FROM documents),
        vocab AS (SELECT w, count(*) AS cnt FROM wx GROUP BY w),
        p AS (
          SELECT unnest(CASE WHEN length(w) >= 2
                   THEN list_transform(range(1, length(w)),
                                       i -> substr(w, CAST(i AS BIGINT), 2))
                   ELSE [] END) AS pair,
                 cnt
          FROM vocab)
        SELECT pair, CAST(sum(cnt) AS BIGINT) AS n
        FROM p GROUP BY pair ORDER BY n DESC, pair ASC LIMIT 20
    """
    from aiwhispr_spark.operators.pii import EMAIL_RE, IPV4_RE, PHONE_RE

    o["k_anonymity_audit"] = """
        WITH base AS (
          SELECT lang, source, CAST(n_chars // 100 AS BIGINT) AS chars_c
          FROM documents
        ),
        lvl0 AS (
          SELECT lang, source, chars_c, CAST(count(*) AS BIGINT) AS n_rows
          FROM base GROUP BY 1, 2, 3
        ),
        ok0 AS (
          SELECT lang, source, chars_c, CAST(0 AS BIGINT) AS anon_level, n_rows
          FROM lvl0 WHERE n_rows >= 5
        ),
        lvl1 AS (
          SELECT lang, source, CAST(sum(n_rows) AS BIGINT) AS n_rows
          FROM lvl0 WHERE n_rows < 5 GROUP BY 1, 2
        )
        SELECT * FROM ok0
        UNION ALL
        SELECT lang, source, CAST(-1 AS BIGINT) AS chars_c,
               CAST(CASE WHEN n_rows >= 5 THEN 1 ELSE 2 END AS BIGINT),
               n_rows
        FROM lvl1
        ORDER BY anon_level, lang, source, chars_c
    """
    o["cdc_dedup_chunks"] = """
        WITH d AS (
          -- length <= 4000: shared gate domain (see the query comment);
          -- range(16, 4096) must cover every position of every kept doc
          SELECT doc_id, text, length(text) AS n FROM documents
          WHERE length(text) <= 4000
        ),
        pos AS (
          SELECT doc_id, text, n, r.range AS p
          FROM d, range(16, 4096) r
          WHERE r.range <= n
        ),
        h AS (
          SELECT doc_id, n, p,
                 sum((unicode(text[p - j.range : p - j.range])
                      * 2654435761 % 4294967296)
                     * (1 << j.range)) % 4294967296 AS hv
          FROM pos, range(16) j
          GROUP BY doc_id, text, n, p
        ),
        cuts AS (
          SELECT doc_id, p FROM h WHERE hv % 32 = 0
          UNION
          SELECT doc_id, n AS p FROM d WHERE n > 0
        ),
        chunks AS (
          SELECT doc_id,
                 coalesce(lag(p) OVER (PARTITION BY doc_id ORDER BY p), 0) + 1 AS s,
                 p AS e
          FROM cuts
        ),
        hashed AS (
          SELECT c.doc_id, md5(substring(d.text, c.s, c.e - c.s + 1)) AS chunk_md5,
                 c.e - c.s + 1 AS chunk_len
          FROM chunks c JOIN d USING (doc_id)
          WHERE c.e - c.s + 1 > 0
        )
        SELECT chunk_md5, CAST(count(*) AS BIGINT) AS n_occ,
               CAST(min(chunk_len) AS BIGINT) AS chunk_len,
               CAST(min(doc_id) AS BIGINT) AS first_id
        FROM hashed
        GROUP BY chunk_md5 HAVING count(*) >= 2
        ORDER BY chunk_md5
    """
    o["pii_redact"] = f"""
        WITH aug0 AS (
          SELECT doc_id,
                 text || ' Contact user' || doc_id || '@example.com from 10.'
                      || (doc_id % 256) || '.0.' || ((doc_id * 7) % 256)
                      || ' or call +1-555-'
                      || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
                      || ' now.' AS t
          FROM documents),
        -- NULL text nulls the whole || chain (mirroring Spark's F.concat);
        -- the PII operator then treats NULL ≡ '' — coalesce AFTER the concat
        aug AS (SELECT doc_id, coalesce(t, '') AS t FROM aug0),
        r1 AS (SELECT doc_id, t,
                      regexp_replace(t, '{EMAIL_RE}', '<EMAIL>', 'g') AS t1
               FROM aug),
        r2 AS (SELECT doc_id, t, t1,
                      regexp_replace(t1, '{IPV4_RE}', '<IP>', 'g') AS t2
               FROM r1)
        SELECT doc_id,
               md5(regexp_replace(t2, '{PHONE_RE}', '<PHONE>', 'g')) AS red_md5,
               CAST(len(regexp_extract_all(t, '{EMAIL_RE}')) AS BIGINT) AS n_emails,
               CAST(len(regexp_extract_all(t1, '{IPV4_RE}')) AS BIGINT) AS n_ips,
               CAST(len(regexp_extract_all(t2, '{PHONE_RE}')) AS BIGINT) AS n_phones
        FROM r2
    """
    o["temperature_mix_sample"] = """
        WITH g AS (
          SELECT doc_id,
                 CASE WHEN doc_id % 10 < 6 THEN 'big'
                      WHEN doc_id % 10 < 9 THEN 'mid'
                      ELSE 'small' END AS src_grp
          FROM documents),
        c AS (SELECT src_grp, count(*) AS n_s FROM g GROUP BY src_grp),
        m AS (SELECT max(n_s) AS n_max FROM c),
        r AS (
          SELECT src_grp,
                 CAST(least(1000000.0,
                      round(pow(CAST(n_max AS DOUBLE) / n_s, 0.5)
                            * 0.5 * 1000000.0)) AS BIGINT) AS rate_i
          FROM c, m)
        SELECT g.doc_id, g.src_grp, r.rate_i
        FROM g JOIN r USING (src_grp)
        WHERE ('0x' || substr(md5(CAST(g.doc_id AS VARCHAR)), 1, 15))::BIGINT
              % 1000000 < r.rate_i
    """
    o["warc_curation_pipeline"] = f"""
        WITH base AS (
          SELECT url, decode(html) AS h,
                 CAST(regexp_extract(url, '/p/(\\d+)$', 1) AS BIGINT) AS i
          FROM read_parquet('{_ensure_simple_corpus()}')),
        allrows AS (
          SELECT url AS doc_id, h FROM base
          UNION ALL
          SELECT 'https://mirror.example.org/m/' || i, h FROM base WHERE i % 5 = 0
          UNION ALL
          SELECT 'https://contact.example.org/c/' || j,
                 '<html><body>' || chr(10) || '<p>Reach ops' || j
                   || '@example.net or 10.9.0.' || (j * 3) || ' today.</p>'
                   || chr(10) || '</body></html>'
          FROM (SELECT unnest(generate_series(0, 14)) AS j)),
        cleaned AS (
          SELECT doc_id, regexp_replace(h, '{CLEANR_PATTERN}', '', 'g') AS txt
          FROM allrows),
        lines AS (
          SELECT doc_id, l AS line, lower(trim(l)) AS norm, ord FROM (
            SELECT doc_id, unnest(string_split(txt, chr(10))) AS l,
                   generate_subscripts(string_split(txt, chr(10)), 1) AS ord
            FROM cleaned)),
        freq AS (SELECT norm FROM lines WHERE norm <> ''
                 GROUP BY norm HAVING count(DISTINCT doc_id) >= 3),
        flagged AS (
          SELECT l.doc_id, l.line, l.ord, (f.norm IS NOT NULL) AS is_dup
          FROM lines l LEFT JOIN freq f ON l.norm = f.norm),
        reasm AS (
          SELECT doc_id,
                 coalesce(string_agg(CASE WHEN NOT is_dup THEN line END,
                                     chr(10) ORDER BY ord), '') AS text_clean,
                 sum(CASE WHEN is_dup THEN 0 ELSE 1 END) AS n_kept,
                 sum(CASE WHEN is_dup THEN 1 ELSE 0 END) AS n_dropped
          FROM flagged GROUP BY doc_id),
        red AS (
          SELECT doc_id,
                 regexp_replace(regexp_replace(regexp_replace(text_clean,
                   '{EMAIL_RE}', '<EMAIL>', 'g'),
                   '{IPV4_RE}', '<IP>', 'g'),
                   '{PHONE_RE}', '<PHONE>', 'g') AS text_red,
                 n_kept, n_dropped
          FROM reasm),
        keep AS (SELECT md5(text_red) AS dg, min(doc_id) AS keep_id
                 FROM red GROUP BY md5(text_red))
        SELECT r.doc_id, md5(r.text_red) AS red_md5,
               CAST(r.n_kept AS BIGINT) AS n_kept,
               CAST(r.n_dropped AS BIGINT) AS n_dropped
        FROM red r JOIN keep k
          ON md5(r.text_red) = k.dg AND r.doc_id = k.keep_id
    """
    o["domain_blocklist_filter"] = """
        SELECT doc_id,
               'https://' || CASE WHEN doc_id % 4 = 0 THEN 'ads.' ELSE '' END
                 || 'site' || (doc_id % 7) || '.example.org/p/' || doc_id AS url
        FROM documents
        WHERE NOT (doc_id % 7 = 3
                   OR (doc_id % 4 = 0 AND doc_id % 7 = 5))
    """
    o["quality_classifier_hashed"] = r"""
        WITH t AS (
          SELECT doc_id,
                 list_filter(regexp_split_to_array(lower(text), '\s+'),
                             tk -> tk <> '') AS toks
          FROM documents),
        w AS (
          SELECT doc_id, len(toks) AS n_tokens,
                 coalesce(list_aggregate(list_transform(toks,
                   tk -> ((('0x' || substr(md5(tk), 1, 8))::BIGINT % 4096)
                          * 2654435761) % 2001 - 1000), 'sum'), 0) AS score_i
          FROM t)
        SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
               CAST(score_i AS BIGINT) AS score_i,
               CAST(CASE WHEN score_i >= 0 THEN 1 ELSE 0 END AS BIGINT)
                 AS keep_i
        FROM w
    """
    o["robots_noindex_filter"] = """
        SELECT doc_id,
               CAST(CASE WHEN doc_id % 6 IN (0, 2, 5) THEN 1 ELSE 0 END
                    AS BIGINT) AS noindex_i,
               CAST(CASE WHEN doc_id % 6 IN (0, 1, 5) THEN 1 ELSE 0 END
                    AS BIGINT) AS nofollow_i
        FROM documents
    """
    o["kmeans_domain_clusters"] = _kmeans_sql(k=8, iterations=2)
    o["ntriples_export"] = f"""
        WITH t AS ({_e3_sql()}),
        h AS (
          SELECT url, subj, pred,
                 obj || CASE CAST(substr(url, 2) AS BIGINT) % 4
                          WHEN 0 THEN ' say "hi"'
                          WHEN 1 THEN ' back\\slash'
                          WHEN 2 THEN ' line1' || chr(10) || 'line2' || chr(9) || 'tab'
                          ELSE '' END AS obj
          FROM t
        )
        SELECT url, subj,
               '<urn:kg:e:' || replace(subj, ' ', '%20') || '> <urn:kg:p:' ||
               replace(pred, ' ', '%20') || '> "' ||
               replace(replace(replace(replace(replace(obj,
                 '\\', '\\\\'),
                 '"', '\\"'),
                 chr(10), '\\n'),
                 chr(13), '\\r'),
                 chr(9), '\\t')
               || '" .' AS line
        FROM h
    """
    def _e_sql(s: str, p: str, obj: str) -> str:
        # TransE energy Σ_i |e(s)_i + r(p)_i − e(o)_i| re-derived from the
        # same md5 integer-thousandths arithmetic as operators/kgscore.py.
        return (
            "CAST(list_aggregate(list_transform(range(0, 16), i -> abs("
            f"((('0x' || substr(md5({s} || ':' || i), 1, 8))::BIGINT % 2001) - 1000)"
            f" + ((('0x' || substr(md5('rel:' || {p} || ':' || i), 1, 8))::BIGINT"
            " % 2001) - 1000)"
            f" - ((('0x' || substr(md5({obj} || ':' || i), 1, 8))::BIGINT % 2001)"
            " - 1000))), 'sum') AS BIGINT)"
        )

    _epos = _e_sql("subj", "pred", "obj")
    _eneg = _e_sql("subj", "pred", "neg_obj")
    o["kg_transe_eval"] = f"""
        WITH base AS (
          SELECT DISTINCT
                 'Entity_' || (doc_id % 40) AS subj,
                 CASE doc_id % 3 WHEN 0 THEN 'founded'
                                 WHEN 1 THEN 'acquired'
                                 ELSE 'based_in' END AS pred,
                 'Entity_' || ((doc_id * 7 + 1) % 40) AS obj
          FROM documents),
        ents AS (
          SELECT entity,
                 CAST(row_number() OVER (ORDER BY entity) - 1 AS BIGINT) AS idx
          FROM (SELECT DISTINCT subj AS entity FROM base)),
        n AS (SELECT count(*) AS n_ents FROM ents),
        cand AS (
          SELECT b.subj, b.pred, b.obj,
                 ('0x' || substr(md5(b.subj || '|' || b.pred || '|' || b.obj
                    || '|' || CAST(i.neg_i AS VARCHAR)), 1, 8))::BIGINT
                   % n.n_ents AS idx
          FROM base b
          CROSS JOIN (SELECT unnest(range(1, 9)) AS neg_i) i
          CROSS JOIN n),
        negs AS (
          SELECT c.subj, c.pred, c.obj, e.entity AS neg_obj
          FROM cand c JOIN ents e USING (idx)
          WHERE e.entity <> c.obj
            AND NOT EXISTS (
              SELECT 1 FROM base b2
              WHERE b2.subj = c.subj AND b2.pred = c.pred
                AND b2.obj = e.entity)),
        stronger AS (
          SELECT subj, pred, obj,
                 SUM(CASE WHEN {_eneg} < {_epos}
                          OR ({_eneg} = {_epos} AND neg_obj < obj)
                     THEN 1 ELSE 0 END) AS n_stronger
          FROM negs GROUP BY subj, pred, obj),
        ranked AS (
          SELECT b.pred, 1 + COALESCE(s.n_stronger, 0) AS rnk
          FROM base b LEFT JOIN stronger s USING (subj, pred, obj))
        SELECT pred, CAST(count(*) AS BIGINT) AS n_triples,
               CAST(SUM(1000000 // rnk) AS BIGINT) AS mrr_sum_i,
               CAST(SUM(CASE WHEN rnk <= 1 THEN 1 ELSE 0 END) AS BIGINT)
                 AS hits1_n,
               CAST(SUM(CASE WHEN rnk <= 3 THEN 1 ELSE 0 END) AS BIGINT)
                 AS hits3_n
        FROM ranked GROUP BY pred
    """

    o["kg_negative_samples"] = f"""
        WITH t AS ({_e3_sql()}),
        base AS (SELECT DISTINCT subj, pred, obj FROM t),
        ents AS (
          SELECT entity,
                 CAST(row_number() OVER (ORDER BY entity) - 1 AS BIGINT) AS idx
          FROM (SELECT DISTINCT subj AS entity FROM base)
        ),
        n AS (SELECT count(*) AS n_ents FROM ents),
        cand AS (
          SELECT b.subj, b.pred, b.obj, i.neg_i,
                 ('0x' || substr(md5(b.subj || '|' || b.pred || '|' || b.obj
                    || '|' || CAST(i.neg_i AS VARCHAR)), 1, 8))::BIGINT
                   % n.n_ents AS idx
          FROM base b
          CROSS JOIN (SELECT unnest([1, 2]) AS neg_i) i
          CROSS JOIN n
        ),
        negs AS (
          SELECT c.subj, c.pred, c.obj, CAST(c.neg_i AS INT) AS neg_i,
                 e.entity AS neg_obj
          FROM cand c JOIN ents e USING (idx)
          WHERE e.entity <> c.obj
        )
        SELECT n1.subj, n1.pred, n1.obj, n1.neg_i, n1.neg_obj
        FROM negs n1
        WHERE NOT EXISTS (
          SELECT 1 FROM base b2
          WHERE b2.subj = n1.subj AND b2.pred = n1.pred AND b2.obj = n1.neg_obj
        )
    """
    o["crawl_change_stats"] = """
        WITH c AS (
          SELECT 'https://site.org/pg/' || (doc_id % 40) AS canon_url,
                 (doc_id * 37) % 1000 AS ts,
                 'https://site.org/pg/' || (doc_id % 40)
                   || CASE WHEN doc_id % 2 = 0 THEN '/' ELSE '' END
                   || CASE WHEN doc_id % 3 = 0 THEN '?utm_source=x' ELSE '' END
                   AS raw_url,
                 md5('v' || (CASE
                   WHEN (doc_id % 40) % 3 = 0 THEN ((doc_id * 37) % 1000) % 2
                   WHEN (doc_id % 40) % 3 = 1 THEN
                     CASE WHEN (doc_id * 37) % 1000 >= 500 THEN 1 ELSE 0 END
                   ELSE 0 END)) AS dg
          FROM documents),
        w AS (
          SELECT canon_url, ts, dg,
                 lag(dg) OVER (PARTITION BY canon_url
                               ORDER BY ts, raw_url, dg) AS pdg
          FROM c)
        SELECT canon_url,
               CAST(count(*) AS BIGINT) AS n_snapshots,
               CAST(count(DISTINCT dg) AS BIGINT) AS n_versions,
               CAST(sum(CASE WHEN pdg IS NOT NULL AND dg <> pdg
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_changes,
               min(ts) AS first_ts, max(ts) AS last_ts
        FROM w GROUP BY canon_url
    """
    o["nofollow_link_extract"] = """
        WITH d AS (SELECT doc_id AS i,
                          'https://s' || (doc_id % 9) || '.org/d/' || doc_id
                            AS src_url
                   FROM documents)
        SELECT src_url, 'https://f' || (i % 5) || '.org/p1' AS dst_url,
               CAST(0 AS INTEGER) AS nofollow FROM d
        UNION ALL
        SELECT src_url, 'https://n' || (i % 4) || '.org/p2',
               CAST(1 AS INTEGER) FROM d
        UNION ALL
        SELECT src_url, 'https://s' || (i % 9) || '.org/local' || (i % 3),
               CAST(1 AS INTEGER) FROM d
        UNION ALL
        SELECT src_url, 'https://k.org/p4', CAST(0 AS INTEGER) FROM d
    """
    o["mobile_variant_clusters"] = """
        WITH p AS (SELECT DISTINCT doc_id % 50 AS p FROM documents)
        SELECT 'https://site' || p || '.org/art/' || p AS variant_key,
               CAST(4 AS BIGINT) AS n_urls,
               CAST(3 AS BIGINT) AS n_variant,
               'https://site' || p || '.org/art/' || p AS canonical_url
        FROM p
    """
    o["snapshot_line_diff"] = """
        WITH d AS (SELECT doc_id AS i, doc_id % 30 AS p FROM documents),
        ends AS (
          SELECT p, min(i) AS i0, max(i) AS i1,
                 CAST(count(*) AS BIGINT) AS n_snapshots
          FROM d GROUP BY p),
        built AS (
          SELECT 'https://site.org/pg/' || p AS canon_url, n_snapshots,
                 ['header ' || p, 'item ' || (i0 % 7)]
                   || (CASE WHEN i0 % 2 = 0 THEN ['extra ' || (p % 5)]
                       ELSE []::VARCHAR[] END) || ['footer'] AS lo,
                 ['header ' || p, 'item ' || (i1 % 7)]
                   || (CASE WHEN i1 % 2 = 0 THEN ['extra ' || (p % 5)]
                       ELSE []::VARCHAR[] END) || ['footer'] AS ln
          FROM ends)
        SELECT canon_url, n_snapshots,
               CAST(len(lo) AS BIGINT) AS n_old_lines,
               CAST(len(ln) AS BIGINT) AS n_new_lines,
               CAST(len(list_filter(ln, x -> NOT list_contains(lo, x)))
                    AS BIGINT) AS n_added,
               CAST(len(list_filter(lo, x -> NOT list_contains(ln, x)))
                    AS BIGINT) AS n_removed,
               CAST(len(list_filter(lo, x -> list_contains(ln, x)))
                    AS BIGINT) AS n_common
        FROM built
    """
    o["anchor_alias_mining"] = f"""
        WITH ids AS (
          SELECT CAST(regexp_extract(url, 'a/(\\d+)$', 1) AS BIGINT) AS i
          FROM read_parquet('{_ensure_link_corpus()}')),
        a AS (
          SELECT 'https://host' || (((i * 7 + 1) % 240) % 12) || '.example.org/a/'
                   || ((i * 7 + 1) % 240) AS dst_url,
                 'page ' || ((i * 7 + 1) % 240) AS anchor
          FROM ids
          UNION ALL
          SELECT 'https://host' || (i % 12) || '.example.org/a/'
                   || ((i * 13 + 5) % 240),
                 'local page ' || ((i * 13 + 5) % 240)
          FROM ids
          UNION ALL
          SELECT 'https://ext' || (i % 5) || '.example.net/x/' || (i % 3),
                 'external'
          FROM ids)
        SELECT dst_url, anchor, CAST(count(*) AS BIGINT) AS n_mentions
        FROM a GROUP BY dst_url, anchor
    """
    from aiwhispr_spark.operators.maincontent import (
        ANCHOR_SPAN_RE,
        BLOCK_SPLIT_RE,
        NEWLINE_RE,
        TAG_RE,
    )

    o["main_content_extract"] = f"""
        WITH blocks AS (
          SELECT url, b AS block, ord FROM (
            SELECT url, unnest(x) AS b, generate_subscripts(x, 1) AS ord FROM (
              SELECT url,
                     regexp_split_to_array(
                       regexp_replace(decode(html), '{NEWLINE_RE}', ' ', 'g'),
                       '{BLOCK_SPLIT_RE}') AS x
              FROM read_parquet('{_ensure_link_corpus()}')))),
        d AS (
          SELECT url, block, ord,
                 length(regexp_replace(block, '{TAG_RE}', '', 'g')) AS visible,
                 length(trim(regexp_replace(block, '{TAG_RE}', '', 'g'))) AS vis_trim,
                 length(regexp_replace(block, '{TAG_RE}', '', 'g'))
                   - length(regexp_replace(regexp_replace(block,
                       '{ANCHOR_SPAN_RE}', '', 'g'), '{TAG_RE}', '', 'g'))
                   AS anchored
          FROM blocks)
        SELECT url,
               md5(coalesce(string_agg(
                 CASE WHEN vis_trim > 0 AND anchored * 100 <= 50 * visible
                      THEN block END, chr(10) ORDER BY ord), '')) AS main_md5,
               CAST(sum(CASE WHEN vis_trim > 0 AND anchored * 100 <= 50 * visible
                             THEN 1 ELSE 0 END) AS BIGINT) AS kept_blocks,
               CAST(count(*) AS BIGINT) AS total_blocks
        FROM d GROUP BY url
    """
    o["dedup_incremental_two_batch"] = """
        SELECT doc_id FROM (
          SELECT doc_id, min(doc_id) OVER (PARTITION BY md5(text)) AS keep_id
          FROM documents
        ) WHERE doc_id = keep_id
    """
    o["embedding_quantize_int8"] = """
        -- CASTs matter: embedding elements are FLOAT and DuckDB's bare 127.0
        -- is DECIMAL — without forcing DOUBLE the division runs at a
        -- different precision than Spark's float/double-literal path and
        -- scale_i flips by one ulp at rounding boundaries (seen at sf0.001)
        WITH src AS (
          SELECT vec_id, embedding,
                 CAST(list_max(list_transform(embedding, x -> abs(x))) AS DOUBLE) AS am
          FROM embeddings WHERE vec_id < 200
        )
        SELECT vec_id,
               CAST(round((am / CAST(127.0 AS DOUBLE)) * CAST(10000000 AS DOUBLE)) AS BIGINT) AS scale_i,
               CAST(i - 1 AS INT) AS dim,
               CAST(CASE WHEN am > 0
                         THEN round(CAST(e AS DOUBLE) / (am / CAST(127.0 AS DOUBLE)))
                         ELSE 0 END AS INT) AS q
        FROM src, LATERAL (
          SELECT unnest(embedding) AS e, generate_subscripts(embedding, 1) AS i
        ) u
    """
    o["ngram_novelty_curve"] = """
        WITH d AS (SELECT doc_id AS i FROM documents),
        g AS (
          SELECT i, 'a' || (i % 5) || ' b' || (i % 7) AS gram FROM d
          UNION ALL SELECT i, 'b' || (i % 7) || ' c' || (i % 3) FROM d
          UNION ALL SELECT i, 'c' || (i % 3) || ' d' || (i % 11) FROM d
        ),
        own AS (SELECT gram, min(i) AS owner FROM g GROUP BY gram),
        nov AS (SELECT owner AS i, count(*) AS n_novel FROM own GROUP BY owner),
        tot AS (SELECT i, count(*) AS n_distinct FROM g GROUP BY i)
        SELECT t.i AS doc_id,
               CAST(t.n_distinct AS BIGINT) AS n_distinct_grams,
               CAST(coalesce(nov.n_novel, 0) AS BIGINT) AS n_novel,
               CAST(round(10000.0 * coalesce(nov.n_novel, 0) / t.n_distinct)
                    AS BIGINT) AS novelty_frac_i
        FROM tot t LEFT JOIN nov ON nov.i = t.i
    """
    o["decontaminate_ngrams"] = """
        WITH toks AS (
          SELECT doc_id,
                 list_filter(regexp_split_to_array(lower(trim(text)), '\\s+'),
                             t -> t <> '') AS arr
          FROM documents
        ),
        grams AS (
          SELECT doc_id, array_to_string(arr[i : i + 12], ' ') AS gram
          FROM toks, LATERAL (SELECT unnest(generate_series(1, len(arr) - 12)) AS i) g
          WHERE len(arr) >= 13
        ),
        bench AS (SELECT DISTINCT gram FROM grams WHERE doc_id % 50 = 0),
        per_doc AS (
          SELECT g.doc_id,
                 CAST(count(*) AS BIGINT) AS n_grams,
                 CAST(sum(CASE WHEN b.gram IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_hit
          FROM grams g LEFT JOIN bench b ON b.gram = g.gram
          GROUP BY g.doc_id
        )
        SELECT d.doc_id,
               coalesce(p.n_grams, 0) AS n_grams,
               coalesce(p.n_hit, 0) AS n_hit,
               CAST(CASE WHEN coalesce(p.n_hit, 0) > 0 THEN 1 ELSE 0 END AS INT) AS contaminated
        FROM documents d LEFT JOIN per_doc p ON p.doc_id = d.doc_id
    """
    o["sdm_proximity_rank"] = """
        WITH tok AS (
          SELECT doc_id,
                 regexp_split_to_array(lower(trim(text)), '\\s+') AS t
          FROM documents
        ),
        pos AS (
          SELECT doc_id, u.s.x AS tok, u.s.i AS pos
          FROM tok,
               unnest(list_transform(t, (x, i) -> struct_pack(x := x, i := i))) u(s)
          WHERE u.s.x IN ('table', 'scan', 'fast')
        ),
        tf AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS tf_total
               FROM pos GROUP BY 1),
        adjp AS (
          SELECT a.doc_id,
                 CAST(count(*) FILTER (WHERE b.pos = a.pos + 1) AS BIGINT) AS o_c,
                 CAST(count(*) FILTER (
                   WHERE abs(b.pos - a.pos) <= 7 AND b.pos <> a.pos
                 ) AS BIGINT) AS u_c
          FROM pos a JOIN pos b ON a.doc_id = b.doc_id
           AND ((a.tok = 'table' AND b.tok = 'scan')
             OR (a.tok = 'scan' AND b.tok = 'fast'))
          GROUP BY 1
        )
        SELECT d.doc_id,
               CAST(coalesce(tf.tf_total, 0) AS BIGINT) AS tf_total,
               CAST(coalesce(adjp.o_c, 0) AS BIGINT) AS ordered_hits,
               CAST(coalesce(adjp.u_c, 0) AS BIGINT) AS unordered_hits,
               CAST(85 * coalesce(tf.tf_total, 0)
                    + 10 * coalesce(adjp.o_c, 0)
                    + 5 * coalesce(adjp.u_c, 0) AS BIGINT) AS sdm_score
        FROM documents d
        LEFT JOIN tf ON d.doc_id = tf.doc_id
        LEFT JOIN adjp ON d.doc_id = adjp.doc_id
        ORDER BY sdm_score DESC, d.doc_id LIMIT 15
    """
    o["bm25_rank"] = """
        WITH toks AS (
          SELECT doc_id, unnest(regexp_split_to_array(lower(trim(text)), '\\s+')) AS token
          FROM documents
        ),
        postings AS (
          SELECT doc_id AS id, token, count(*) AS tf
          FROM toks WHERE token <> '' GROUP BY doc_id, token
        ),
        dl AS (
          SELECT doc_id AS id,
                 CAST(len(list_filter(regexp_split_to_array(lower(trim(text)), '\\s+'),
                                      t -> t <> '')) AS DOUBLE) AS dl
          FROM documents
        ),
        stats AS (SELECT CAST(count(*) AS DOUBLE) AS n_docs, avg(dl) AS avgdl FROM dl),
        hits AS (SELECT * FROM postings WHERE token IN ('data', 'fast', 'query')),
        dfp AS (SELECT token, count(DISTINCT id) AS df FROM hits GROUP BY token),
        scored AS (
          SELECT h.id, h.token,
                 ln(1.0 + (s.n_docs - d.df + 0.5) / (d.df + 0.5))
                   * h.tf / (h.tf + 1.2 * (1.0 - 0.75 + 0.75 * l.dl / s.avgdl)) AS contrib
          FROM hits h JOIN dfp d USING (token) JOIN dl l ON l.id = h.id, stats s
        )
        SELECT id AS doc_id,
               CAST(round(10000 * sum(contrib)) AS BIGINT) AS score_i,
               CAST(count(DISTINCT token) AS INT) AS n_terms
        FROM scored GROUP BY id ORDER BY score_i DESC, doc_id LIMIT 20
    """
    o["phrase_search_positional"] = """
        WITH toks AS (
          SELECT doc_id,
                 unnest(regexp_split_to_array(lower(trim(text)), '\\s+')) AS token,
                 generate_subscripts(regexp_split_to_array(lower(trim(text)), '\\s+'), 1) - 1 AS pos
          FROM documents
        ),
        starts AS (
          SELECT doc_id, pos - slot_off AS start
          FROM toks JOIN (VALUES ('hash', 0), ('value', 1)) s(token, slot_off) USING (token)
          WHERE token <> ''
          GROUP BY doc_id, pos - slot_off
          HAVING count(*) = 2
        )
        SELECT doc_id, CAST(count(*) AS BIGINT) AS n_occurrences
        FROM starts GROUP BY doc_id
        ORDER BY n_occurrences DESC, doc_id LIMIT 20
    """
    o["websearch_parse_filter"] = """
        WITH t AS (
          SELECT doc_id, lang,
                 ' ' || regexp_replace(lower(trim(text)), '\\s+', ' ', 'g') || ' ' AS pt
          FROM documents
        )
        SELECT doc_id, lang FROM t
        WHERE position(' table value ' IN pt) > 0
          AND (position(' scan ' IN pt) > 0 OR position(' merge ' IN pt) > 0)
          AND NOT position(' vector ' IN pt) > 0
    """
    o["dedup_exact"] = """
        SELECT doc_id,
               min(doc_id) OVER (PARTITION BY md5(text)) AS keep_id,
               count(*) OVER (PARTITION BY md5(text)) AS group_size
        FROM documents
    """
    o["ngram_jaccard_pairs"] = """
        WITH d AS (
          SELECT doc_id AS id, list_distinct(regexp_split_to_array(trim(text), '\\s+')) AS toks
          FROM documents WHERE doc_id < 200
        )
        SELECT l.id AS a, r.id AS b,
               CAST(round(10000 * len(list_intersect(l.toks, r.toks))::DOUBLE
                    / len(list_distinct(l.toks || r.toks))) AS BIGINT) AS jaccard_i
        FROM d l JOIN d r ON l.id < r.id
        WHERE CAST(round(10000 * len(list_intersect(l.toks, r.toks))::DOUBLE
                   / len(list_distinct(l.toks || r.toks))) AS BIGINT) >= 5000
    """
    o["containment_syndication_pairs"] = """
        WITH d0 AS (SELECT doc_id, text FROM documents WHERE doc_id < 300),
        alld AS (
          SELECT doc_id AS id, text FROM d0
          UNION ALL
          SELECT doc_id + 10000,
                 'Syndicated digest follows . ' || text || ' . All rights reserved .'
          FROM d0 WHERE doc_id % 4 = 0
        ),
        toks AS (SELECT id, regexp_split_to_array(trim(text), '\\s+') AS t FROM alld),
        base AS (
          SELECT id,
                 list_distinct(list_transform(generate_series(1, len(t) - 2),
                               i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS sh
          FROM toks WHERE len(t) >= 3
        ),
        post AS (SELECT id, unnest(sh) AS fp FROM base),
        rare AS (SELECT fp FROM post GROUP BY fp HAVING count(*) <= 500),
        p AS (SELECT post.id, post.fp FROM post JOIN rare USING (fp)),
        cand AS (SELECT DISTINCT l.id AS a, r.id AS b
                 FROM p l JOIN p r ON r.fp = l.fp AND l.id < r.id),
        v AS (SELECT c.a, c.b, len(ba.sh) AS n_a, len(bb.sh) AS n_b,
                     len(list_intersect(ba.sh, bb.sh)) AS n_common
              FROM cand c JOIN base ba ON ba.id = c.a JOIN base bb ON bb.id = c.b)
        SELECT a AS contained, b AS container,
               CAST(n_a AS BIGINT) AS n_contained,
               CAST(n_common AS BIGINT) AS n_common,
               CAST((1000000 * n_common) // n_a AS BIGINT) AS containment_i
        FROM v WHERE (1000000 * n_common) // n_a >= 900000
        UNION ALL
        SELECT b, a, CAST(n_b AS BIGINT), CAST(n_common AS BIGINT),
               CAST((1000000 * n_common) // n_b AS BIGINT)
        FROM v WHERE (1000000 * n_common) // n_b >= 900000
    """
    o["snm_candidate_pairs"] = """
        WITH r AS (
          SELECT doc_id AS id,
                 'k' || lpad(CAST((doc_id * 7) % 100 AS VARCHAR), 2, '0') AS key,
                 row_number() OVER (
                   ORDER BY 'k' || lpad(CAST((doc_id * 7) % 100 AS VARCHAR), 2, '0'),
                            doc_id) AS rk
          FROM documents)
        SELECT a.id AS id_a, b.id AS id_b, CAST(b.rk - a.rk AS BIGINT) AS gap
        FROM r a JOIN r b ON b.rk > a.rk AND b.rk <= a.rk + 2
    """
    o["fellegi_sunter_linkage"] = """
        WITH rec AS (
          SELECT doc_id AS rid, doc_id % 60 AS ekey, (doc_id % 60) % 12 AS block,
                 CASE WHEN doc_id // 60 = 1 THEN 'Entity ' || (doc_id % 60) || ' Inc'
                      WHEN doc_id // 60 = 2 THEN 'entity ' || (doc_id % 60)
                      ELSE 'Entity ' || (doc_id % 60) END AS name,
                 'City ' || (CASE WHEN doc_id // 60 = 2 THEN (doc_id % 60 + 1) % 7
                                  ELSE (doc_id % 60) % 7 END) AS city,
                 1980 + (doc_id % 60) % 30
                   + CASE WHEN doc_id // 60 = 1 THEN 1 ELSE 0 END AS year
          FROM documents WHERE doc_id < 240
        ),
        pairs AS (
          SELECT l.rid AS rid_a, r.rid AS rid_b,
                 l.name = r.name AS agr_name, l.city = r.city AS agr_city,
                 l.year = r.year AS agr_year, l.ekey = r.ekey AS is_match
          FROM rec l JOIN rec r ON l.block = r.block AND l.rid < r.rid
        ),
        c AS (
          SELECT
            CAST(sum(CASE WHEN is_match THEN 1 ELSE 0 END) AS BIGINT) AS nm,
            CAST(sum(CASE WHEN NOT is_match THEN 1 ELSE 0 END) AS BIGINT) AS nu,
            CAST(sum(CASE WHEN is_match AND agr_name THEN 1 ELSE 0 END) AS BIGINT) AS ma_0,
            CAST(sum(CASE WHEN NOT is_match AND agr_name THEN 1 ELSE 0 END) AS BIGINT) AS ua_0,
            CAST(sum(CASE WHEN is_match AND agr_city THEN 1 ELSE 0 END) AS BIGINT) AS ma_1,
            CAST(sum(CASE WHEN NOT is_match AND agr_city THEN 1 ELSE 0 END) AS BIGINT) AS ua_1,
            CAST(sum(CASE WHEN is_match AND agr_year THEN 1 ELSE 0 END) AS BIGINT) AS ma_2,
            CAST(sum(CASE WHEN NOT is_match AND agr_year THEN 1 ELSE 0 END) AS BIGINT) AS ua_2
          FROM pairs
        ),
        s0 AS (SELECT p.*, c.*, CAST(1000000 AS BIGINT) AS lr FROM pairs p, c),
        s1 AS (SELECT *,
                 (lr * (CASE WHEN agr_name THEN (ma_0+1)*(nu+2)
                             ELSE (nm+1-ma_0)*(nu+2) END))
                 // (CASE WHEN agr_name THEN (nm+2)*(ua_0+1)
                          ELSE (nm+2)*(nu+1-ua_0) END) AS lr1 FROM s0),
        s2 AS (SELECT *,
                 (lr1 * (CASE WHEN agr_city THEN (ma_1+1)*(nu+2)
                              ELSE (nm+1-ma_1)*(nu+2) END))
                 // (CASE WHEN agr_city THEN (nm+2)*(ua_1+1)
                          ELSE (nm+2)*(nu+1-ua_1) END) AS lr2 FROM s1),
        s3 AS (SELECT *,
                 (lr2 * (CASE WHEN agr_year THEN (ma_2+1)*(nu+2)
                              ELSE (nm+1-ma_2)*(nu+2) END))
                 // (CASE WHEN agr_year THEN (nm+2)*(ua_2+1)
                          ELSE (nm+2)*(nu+1-ua_2) END) AS lr3 FROM s2)
        SELECT rid_a, rid_b,
               (CASE WHEN agr_name THEN '1' ELSE '0' END)
               || (CASE WHEN agr_city THEN '1' ELSE '0' END)
               || (CASE WHEN agr_year THEN '1' ELSE '0' END) AS pattern,
               CAST(lr3 AS BIGINT) AS lr_i,
               CAST(CASE WHEN is_match THEN 1 ELSE 0 END AS INTEGER) AS gold_i
        FROM s3
    """
    o["embedding_near_dup"] = """
        WITH e AS (SELECT vec_id AS id, embedding::DOUBLE[] AS v FROM embeddings WHERE vec_id < 300),
        p AS (
          SELECT l.id AS a, r.id AS b,
                 CAST(round(10000 * list_dot_product(l.v, r.v)
                      / (sqrt(list_dot_product(l.v, l.v)) * sqrt(list_dot_product(r.v, r.v)))) AS BIGINT) AS cos_i
          FROM e l JOIN e r ON l.id < r.id
        )
        SELECT a, b, cos_i FROM p WHERE cos_i >= 3500
    """
    o["knn_join_top3"] = """
        WITH e AS (SELECT vec_id AS id, embedding::DOUBLE[] AS v FROM embeddings),
        p AS (
          SELECT l.id AS a, r.id AS b,
                 CAST(round(10000 * list_dot_product(l.v, r.v)
                      / (sqrt(list_dot_product(l.v, l.v)) * sqrt(list_dot_product(r.v, r.v)))) AS BIGINT) AS cos_i
          FROM e l JOIN e r ON l.id < 20 AND r.id < 500 AND l.id <> r.id
        ),
        ranked AS (
          SELECT a, b, cos_i, row_number() OVER (PARTITION BY a ORDER BY cos_i DESC, b) AS rank
          FROM p
        )
        SELECT a, b, cos_i, CAST(rank AS INT) AS rank FROM ranked WHERE rank <= 3
    """
    lang_cases = []
    for lang in ("en", "de", "es", "fr"):
        lang_cases.append(
            f"len(list_intersect(toks, {_stop_array_sql(lang)})) AS s_{lang}"
        )
    # detected-language statement (doc_id, lang_detected) — shared by the
    # lang_id gate and the declared-vs-detected mismatch gate
    _lang_detect_sql = f"""
        WITH t AS (
          -- coalesce: NULL text ≡ '' (zero evidence → 'en'); un-coalesced,
          -- NULL scores fall through the CASE chain to the ELSE 'fr' arm
          -- while Spark's when-chain lands 'en' (r5 NULL-injection finding)
          SELECT doc_id,
                 list_distinct(regexp_split_to_array(lower(trim(coalesce(text, ''))), '\\s+')) AS toks
          FROM documents
        ),
        s AS (SELECT doc_id, {', '.join(lang_cases)} FROM t),
        g AS (SELECT *, greatest(s_en, s_de, s_es, s_fr) AS best FROM s)
        SELECT doc_id,
               CASE WHEN best = 0 THEN 'en'
                    WHEN s_en = best THEN 'en'
                    WHEN s_de = best THEN 'de'
                    WHEN s_es = best THEN 'es'
                    ELSE 'fr' END AS lang_detected
        FROM g
    """
    o["lang_id_heuristic"] = _lang_detect_sql
    o["declared_lang_mismatch"] = f"""
        WITH det AS ({_lang_detect_sql}),
        dec AS (
          SELECT doc_id,
                 CASE WHEN doc_id % 6 = 3 THEN ''
                      WHEN doc_id % 6 = 0 THEN 'zz'
                      ELSE coalesce(lang, '') END AS primary_lang
          FROM documents
        )
        SELECT 'u' || dec.doc_id AS url,
               dec.primary_lang AS declared_lang,
               det.lang_detected AS detected_lang,
               CAST(CASE WHEN dec.primary_lang <> '' THEN 1 ELSE 0 END
                    AS INTEGER) AS has_declared_i,
               CAST(CASE WHEN dec.primary_lang <> ''
                          AND dec.primary_lang <> det.lang_detected
                    THEN 1 ELSE 0 END AS INTEGER) AS mismatch_i
        FROM dec JOIN det USING (doc_id)
    """
    o["kg_ktruss"] = """
        WITH d AS (SELECT doc_id AS i FROM documents),
        p AS (SELECT DISTINCT
                least('c' || (i % 5), 'c' || ((i % 5 + 1 + i % 4) % 5)) AS a,
                greatest('c' || (i % 5), 'c' || ((i % 5 + 1 + i % 4) % 5)) AS b
              FROM d)
        SELECT a, b, CAST(3 AS BIGINT) AS support FROM p
    """
    o["kg_ego_subgraph"] = """
        SELECT a, b, CAST(ah AS INTEGER) AS a_hops, CAST(bh AS INTEGER) AS b_hops
        FROM (VALUES
          ('r00', 'r01', 0, 1),
          ('r01', 'r02', 1, 2),
          ('r02', 'r03', 2, 3),
          ('r09', 'r10', 3, 2),
          ('r10', 'r11', 2, 1),
          ('r00', 'r11', 0, 1),
          ('r01', 'r10', 1, 2)
        ) v(a, b, ah, bh)
    """
    o["kg_void_stats"] = f"""
        WITH t AS ({_kg_e2e_sql()}),
        f AS (SELECT DISTINCT subj, pred, obj FROM t)
        SELECT coalesce(pred, '__dataset__') AS part,
               CAST(count(*) AS BIGINT) AS n_triples,
               CAST(count(DISTINCT subj) AS BIGINT) AS n_subjects,
               CAST(count(DISTINCT obj) AS BIGINT) AS n_objects
        FROM f GROUP BY ROLLUP (pred)
    """
    o["sitemap_index_expand"] = """
        WITH d AS (SELECT doc_id AS i FROM documents)
        SELECT 'h' || (i % 8) AS host,
               'https://h' || (i % 8) || '.example.org/sm/' || (i % 5) || '.xml'
                 AS child_loc,
               '2024-0' || ((i % 9) + 1) || '-15' AS lastmod_day
        FROM d
        UNION ALL
        SELECT 'h' || (i % 8),
               'https://h' || (i % 8) || '.example.org/sm/extra.xml',
               NULL
        FROM d
    """
    _n2v_idx = (
        "CAST(('0x' || substr(md5({key}), 1, 8))::BIGINT % {n} AS INT) + 1"
    )
    o["node2vec_walks"] = f"""
        WITH d AS (SELECT doc_id AS i FROM documents),
        e AS (
          SELECT DISTINCT 'n' || (i % 8) AS src,
                 'n' || ((i % 8 + 1) % 8) AS dst FROM d
          UNION
          SELECT DISTINCT 'n' || (i % 8), 'n' || ((i % 8 + 2) % 8) FROM d
        ),
        nb AS (SELECT src, list_sort(list(DISTINCT dst)) AS nbrs,
                      CAST(count(DISTINCT dst) AS BIGINT) AS nd
               FROM e GROUP BY src),
        starts AS (SELECT DISTINCT src AS node FROM e
                   UNION SELECT DISTINCT dst FROM e),
        s1 AS (SELECT st.node AS start, st.node AS p1,
                      nb.nbrs[{_n2v_idx.format(key="st.node || ':1'", n="nb.nd")}]
                        AS c1
               FROM starts st JOIN nb ON nb.src = st.node),
        s2p AS (SELECT s.start, s.p1, s.c1,
                       flatten(list_transform(c.nbrs,
                         x -> list_transform(range(
                           CASE WHEN x = s.p1 THEN 1
                                WHEN list_contains(p.nbrs, x) THEN 2
                                ELSE 4 END), y -> x))) AS exp2
                FROM s1 s JOIN nb c ON c.src = s.c1
                          JOIN nb p ON p.src = s.p1),
        s2 AS (SELECT start, p1, c1, c1 AS p2,
                      exp2[{_n2v_idx.format(key="p1 || '|' || c1 || ':2'", n="len(exp2)")}]
                        AS c2
               FROM s2p),
        s3p AS (SELECT s.start, s.p2, s.c2,
                       flatten(list_transform(c.nbrs,
                         x -> list_transform(range(
                           CASE WHEN x = s.p2 THEN 1
                                WHEN list_contains(p.nbrs, x) THEN 2
                                ELSE 4 END), y -> x))) AS exp3
                FROM s2 s JOIN nb c ON c.src = s.c2
                          JOIN nb p ON p.src = s.p2),
        s3 AS (SELECT start,
                      exp3[{_n2v_idx.format(key="p2 || '|' || c2 || ':3'", n="len(exp3)")}]
                        AS c3
               FROM s3p)
        SELECT node AS start, CAST(0 AS BIGINT) AS step, node FROM starts
        UNION ALL SELECT start, CAST(1 AS BIGINT), c1 FROM s1
        UNION ALL SELECT start, CAST(2 AS BIGINT), c2 FROM s2
        UNION ALL SELECT start, CAST(3 AS BIGINT), c3 FROM s3
    """
    o["kg_rdfs_schema"] = """
        WITH dd AS (SELECT CAST(count(*) AS BIGINT) AS n,
                           CAST(sum(CASE WHEN doc_id % 10 <> 0 THEN 1 ELSE 0 END)
                                AS BIGINT) AS n_year,
                           -- employee counts 1800..2099 classify as year
                           -- shapes, not integers (r4 sf0.1 sweep)
                           CAST(sum(CASE WHEN doc_id % 7 <> 0
                                         AND doc_id NOT BETWEEN 1800 AND 2099
                                    THEN 1 ELSE 0 END)
                                AS BIGINT) AS n_int
                    FROM documents)
        SELECT 'founded_in' AS pred, 'owl:DatatypeProperty' AS prop_kind,
               'xsd:gYear' AS range_iri, n AS n_total,
               CAST(1000 * n_year // n AS BIGINT) AS share_pm
        FROM dd
        UNION ALL SELECT 'employees', 'owl:DatatypeProperty', 'xsd:integer', n,
               CAST(1000 * n_int // n AS BIGINT) FROM dd
        UNION ALL SELECT 'launched', 'owl:DatatypeProperty', 'xsd:date', n,
               CAST(1000 AS BIGINT) FROM dd
        UNION ALL SELECT 'homepage', 'owl:DatatypeProperty', 'xsd:anyURI', n,
               CAST(1000 AS BIGINT) FROM dd
        UNION ALL SELECT 'ceo', 'owl:ObjectProperty', 'rdfs:Resource', n,
               CAST(1000 AS BIGINT) FROM dd
        UNION ALL SELECT 'note', 'owl:DatatypeProperty', 'xsd:string', n,
               CAST(1000 AS BIGINT) FROM dd
    """
    o["corpus_vocab_stats"] = r"""
        WITH toks AS (
          SELECT lang, tok FROM (
            SELECT lang,
                   unnest(regexp_split_to_array(lower(text), '\s+')) AS tok
            FROM documents) WHERE tok <> ''),
        vocab AS (SELECT lang, tok, CAST(count(*) AS BIGINT) AS n
                  FROM toks GROUP BY lang, tok),
        ranked AS (SELECT *, row_number() OVER (PARTITION BY lang
                                                ORDER BY n DESC, tok) AS rk
                   FROM vocab)
        SELECT lang, CAST(sum(n) AS BIGINT) AS n_tokens,
               CAST(count(*) AS BIGINT) AS vocab_size,
               CAST(sum(CASE WHEN n = 1 THEN 1 ELSE 0 END) AS BIGINT) AS hapax_n,
               CAST(1000 * sum(CASE WHEN n = 1 THEN 1 ELSE 0 END) // sum(n)
                    AS BIGINT) AS hapax_share_pm,
               CAST(1000 * sum(CASE WHEN rk <= 10 THEN n ELSE 0 END) // sum(n)
                    AS BIGINT) AS top10_share_pm
        FROM ranked GROUP BY lang
    """
    o["kg_seeded_label_propagation"] = """
        SELECT node, label, CAST(s AS INTEGER) AS is_seed_i
        FROM (VALUES
          ('a0', 'org', 1), ('a1', 'org', 1), ('b0', 'person', 1),
          ('m1', 'org', 0), ('m2', 'org', 0), ('m3', 'person', 0),
          ('v', 'org', 0),
          ('u1', NULL, 0), ('u2', NULL, 0)
        ) t(node, label, s)
    """
    o["robots_sitemap_discovery"] = """
        WITH ks AS (SELECT DISTINCT doc_id % 6 AS h, doc_id % 3 AS m
                    FROM documents)
        SELECT 'h' || h AS host,
               'https://h' || h || '.example.org/sitemap' || m || '.xml'
                 AS sitemap_url
        FROM ks
        UNION
        SELECT DISTINCT 'h' || h, 'https://h' || h || '.example.org/news.xml'
        FROM ks
    """
    o["token_counts"] = """
        WITH d AS (SELECT doc_id, coalesce(text, '') AS text FROM documents)
        SELECT doc_id,
               CASE WHEN length(trim(text)) = 0 THEN 0
                    ELSE CAST(len(regexp_split_to_array(trim(text), '\\s+')) AS INT) END AS ws_tokens,
               CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]')) AS INT) AS bpe_tokens
        FROM d
    """
    o["doc_fingerprint"] = (
        "SELECT doc_id, ('0x' || substr(md5(coalesce(text, '')), 1, 15))::BIGINT AS fp"
        " FROM documents"
    )
    en_stop = _stop_array_sql("en")
    o["quality_features"] = f"""
        WITH d AS (SELECT doc_id, coalesce(text, '') AS text FROM documents),
        t AS (
          SELECT doc_id, text, length(text) AS n_chars,
                 CASE WHEN length(trim(text)) = 0 THEN 0
                      ELSE len(regexp_split_to_array(trim(text), '\\s+')) END AS n_tok,
                 length(regexp_replace(text, '[^.,;:!?''"()\\[\\]{{}}]', '', 'g')) AS punct,
                 len(list_intersect(list_distinct(regexp_split_to_array(lower(trim(text)), '\\s+')),
                                    {en_stop})) AS stop_hits
          FROM d
        )
        SELECT doc_id, CAST(n_tok AS INT) AS n_tokens,
               CAST(round(10000 * (CASE WHEN n_tok > 0 THEN (n_chars - (n_tok - 1))::DOUBLE / n_tok ELSE 0 END)) AS BIGINT) AS mean_word_len_i,
               CAST(round(10000 * (CASE WHEN n_tok > 0 THEN stop_hits / 10.0 ELSE 0 END)) AS BIGINT) AS stopword_ratio_i,
               CAST(round(10000 * round(
                 least(n_tok / 100.0, 1.0) * 0.4
                 + (CASE WHEN n_tok > 0 THEN stop_hits / 10.0 ELSE 0 END) * 0.4
                 + (1.0 - least((CASE WHEN n_chars > 0 THEN punct::DOUBLE / n_chars ELSE 0 END) * 5.0, 1.0)) * 0.2
               , 6)) AS BIGINT) AS quality_i
        FROM t
    """
    o["repetition_signals"] = """
        WITH src AS (
          SELECT doc_id,
                 text || chr(10) || substr(text, 1, 50) || chr(10) || substr(text, 1, 50) AS t,
                 text
          FROM documents
        ),
        linespl AS (
          SELECT doc_id, text,
                 list_filter(string_split(t, chr(10)), x -> x <> '') AS lines
          FROM src
        ),
        dupfrac AS (
          SELECT doc_id, text,
                 list_sum(list_transform(lines,
                   x -> CASE WHEN len(list_filter(lines, y -> y = x)) > 1
                             THEN length(x) ELSE 0 END)) AS dup_chars,
                 list_sum(list_transform(lines, x -> length(x))) AS tot_chars
          FROM linespl
        ),
        toks AS (
          SELECT doc_id, dup_chars, tot_chars,
                 regexp_split_to_array(lower(trim(text)), '\\s+')[1:200] AS tk
          FROM dupfrac
        ),
        bgrows AS (
          SELECT doc_id, unnest(list_transform(generate_series(1, len(tk) - 1),
                                i -> tk[i] || ' ' || tk[i+1])) AS bg
          FROM toks
        ),
        bgtop AS (
          SELECT doc_id, max(c) AS topc, sum(c) AS total FROM (
            SELECT doc_id, bg, count(*) AS c FROM bgrows GROUP BY doc_id, bg
          ) GROUP BY doc_id
        )
        SELECT t.doc_id,
               CAST(round(10000 * CASE WHEN t.tot_chars > 0
                    THEN t.dup_chars::DOUBLE / t.tot_chars ELSE 0 END) AS BIGINT) AS dup_line_frac_i,
               CAST(round(10000 * CASE WHEN g.topc IS NOT NULL AND g.total > 0
                    THEN g.topc::DOUBLE / g.total ELSE 0 END) AS BIGINT) AS top_bigram_frac_i
        FROM toks t LEFT JOIN bgtop g ON g.doc_id = t.doc_id
    """
    o["url_rendezvous_shards"] = """
        WITH k AS (
          SELECT 'https://h' || (doc_id % 40) || '.org/p/' || doc_id AS url
          FROM documents
        ),
        s(shard) AS (VALUES ('fetcher-a'), ('fetcher-b'), ('fetcher-c'),
                            ('fetcher-d'), ('fetcher-e')),
        w AS (
          SELECT url, shard,
                 ('0x' || substr(md5(url || '|' || shard), 1, 15))::BIGINT AS w
          FROM k, s
        ),
        r AS (
          SELECT url, shard,
                 row_number() OVER (PARTITION BY url ORDER BY w DESC, shard DESC)
                   AS rn
          FROM w
        )
        SELECT url, shard FROM r WHERE rn = 1
    """
    o["percolate_matches"] = """
        WITH d AS (SELECT doc_id, doc_id % 5 AS a, doc_id % 3 AS b
                   FROM documents)
        SELECT doc_id, 'q1' AS query_id FROM d WHERE a = 0
        UNION ALL SELECT doc_id, 'q2' FROM d WHERE b = 1 AND a = 2
        UNION ALL SELECT doc_id, 'q3' FROM d
        UNION ALL SELECT doc_id, 'q5' FROM d
        UNION ALL SELECT doc_id, 'q6' FROM d
    """
    o["gopher_quality_filter"] = """
        WITH dec0 AS (
          SELECT doc_id,
                 text
                 || CASE WHEN (doc_id % 12) % 4 = 0
                         THEN chr(10) || '- bullet one' || chr(10) || '- bullet two'
                              || chr(10) || 'tail line ...' ELSE '' END
                 || CASE WHEN (doc_id % 12) % 3 = 0 THEN ' ### ... … ### ...' ELSE '' END
                 || CASE WHEN (doc_id % 12) % 5 = 0
                         THEN ' the cat sat with that to be of and' ELSE '' END
                 || CASE WHEN (doc_id % 12) % 7 = 0
                         THEN ' 101 202 303 404 505 606 707 808 909 111 222 333' ELSE '' END
                 || CASE WHEN doc_id % 12 = 8
                         THEN chr(10) || '- b0' || chr(10) || '- b1' || chr(10) || '- b2'
                           || chr(10) || '- b3' || chr(10) || '- b4' || chr(10) || '- b5'
                           || chr(10) || '- b6' || chr(10) || '- b7' || chr(10) || '- b8'
                           || chr(10) || '- b9' || chr(10) || '- b10' || chr(10) || '- b11'
                           || chr(10) || '- b12' || chr(10) || '- b13' || chr(10) || '- b14'
                           || chr(10) || '- b15' || chr(10) || '- b16' || chr(10) || '- b17'
                           || chr(10) || '- b18' || chr(10) || '- b19' ELSE '' END
                 || CASE WHEN doc_id % 12 = 9
                         THEN ' ' || repeat('a b c d e f g h i j k l m n o p q r s t u v w x y z ', 3)
                         ELSE '' END
                 AS t
          FROM documents
        ),
        -- NULL text nulls the whole || chain (mirroring Spark's F.concat);
        -- gopher_rules then coalesces to '' — same here, AFTER the concat
        dec AS (SELECT doc_id, coalesce(t, '') AS t FROM dec0),
        m AS (
          SELECT doc_id,
                 CASE WHEN length(trim(t)) = 0 THEN 0
                      ELSE len(regexp_split_to_array(trim(t), '\\s+')) END AS n_words,
                 length(regexp_replace(t, '\\s+', '', 'g')) AS chars_in_words,
                 len(regexp_extract_all(t, '#|\\.\\.\\.|…')) AS n_sym,
                 list_filter(string_split(t, chr(10)), x -> trim(x) <> '') AS lines,
                 regexp_split_to_array(lower(trim(t)), '\\s+') AS words
          FROM dec
        ),
        c AS (
          SELECT doc_id, n_words, chars_in_words, n_sym,
                 len(lines) AS n_lines,
                 len(list_filter(lines, x -> regexp_matches(trim(x), '^[-*•]'))) AS n_bullet,
                 len(list_filter(lines, x -> regexp_matches(trim(x), '(\\.\\.\\.|…)$'))) AS n_ellipsis,
                 len(list_filter(words, w -> regexp_matches(w, '[a-z]'))) AS n_alpha,
                 len(list_intersect(list_distinct(words),
                     ['the','be','to','of','and','that','have','with'])) AS n_stop
          FROM m
        )
        SELECT doc_id, CAST(n_words AS BIGINT) AS n_words,
               CAST(n_words >= 40 AND n_words <= 90 AS INT) AS r_wordcount,
               CAST(3 * n_words <= chars_in_words AND chars_in_words <= 10 * n_words AS INT) AS r_meanlen,
               CAST(n_sym * 10 <= n_words AS INT) AS r_symbol,
               CAST(n_bullet * 10 <= n_lines * 9 AS INT) AS r_bullets,
               CAST(n_ellipsis * 10 <= n_lines * 3 AS INT) AS r_ellipsis,
               CAST(n_alpha * 10 >= n_words * 8 AS INT) AS r_alpha,
               CAST(n_stop >= 2 AS INT) AS r_stopwords,
               CAST(n_words >= 40 AND n_words <= 90
                    AND 3 * n_words <= chars_in_words AND chars_in_words <= 10 * n_words
                    AND n_sym * 10 <= n_words
                    AND n_bullet * 10 <= n_lines * 9
                    AND n_ellipsis * 10 <= n_lines * 3
                    AND n_alpha * 10 >= n_words * 8
                    AND n_stop >= 2 AS INT) AS keep
        FROM c
    """
    o["weighted_sample_es"] = """
        WITH p AS (
          SELECT source, doc_id,
                 ln((CAST(('0x' || substr(md5('es1|' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT
                          AS DOUBLE) + 1) / 1152921504606846976.0)
                 / CAST(n_chars AS DOUBLE) AS es_key
          FROM documents
          WHERE CAST(n_chars AS DOUBLE) > 0
        ),
        r AS (
          SELECT source, doc_id,
                 CAST(row_number() OVER (
                   PARTITION BY source ORDER BY es_key DESC, doc_id) AS INT) AS rk
          FROM p
        )
        SELECT source, doc_id, rk FROM r WHERE rk <= 5
    """
    o["compaction_plan"] = """
        WITH listing AS (
          SELECT source AS part_dir,
                 'part-' || lpad(CAST(doc_id AS VARCHAR), 6, '0') AS file_name,
                 CAST(n_chars AS BIGINT) AS size_bytes
          FROM documents
        )
        SELECT part_dir, file_name, size_bytes,
               CAST((SUM(size_bytes) OVER (
                  PARTITION BY part_dir ORDER BY file_name
                  ROWS UNBOUNDED PRECEDING) - size_bytes) // 1024 AS BIGINT) AS bin
        FROM listing
    """
    o["xml_native_roundtrip"] = """
        WITH d AS (
          SELECT i,
                 'xml éü中 ' || i || ' with "quotes" & <tags>' || chr(10)
                   || 'tail ' || (i * i % 89) AS body
          FROM range(300) t(i)
        )
        SELECT i - 5 AS doc_id,
               CASE WHEN i % 7 <> 0
                    THEN ['en','de','fr','es'][CAST(i % 4 AS INT) + 1] END AS lang,
               CAST(length(body) AS BIGINT) AS n_chars,
               md5(body) AS body_md5,
               CAST((i * 3) % 23 AS BIGINT) AS score
        FROM d
    """
    o["video_frame_stats"] = """
        WITH clips AS (
          SELECT i, 8 + (i % 3) * 4 AS w, 6 + (i % 2) * 2 AS h, 5 + i % 7 AS n,
                 CASE WHEN i % 2 = 1 THEN 30000 ELSE 25 END AS fps_num
          FROM range(40) t(i)
        ),
        frames AS (
          SELECT c.*, f.f
          FROM clips c, range(11) f(f)
          WHERE f.f < c.n AND f.f % 3 = 0
        ),
        sums AS (
          SELECT i, f, w, h, fps_num,
                 SUM((i*11 + f*7 + r.r*5 + cc.c*3) % 251) AS y_sum
          FROM frames, range(8) r(r), range(16) cc(c)
          WHERE r.r < h AND cc.c < w
          GROUP BY 1, 2, 3, 4, 5
        )
        SELECT 'vid-' || i AS media_id, CAST(f AS INT) AS frame_idx,
               CAST(w AS INT) AS width, CAST(h AS INT) AS height,
               CAST(fps_num AS INT) AS fps_num, CAST(y_sum AS BIGINT) AS y_sum,
               CAST(y_sum * 10000 // (w*h) AS BIGINT) AS y_mean_mi
        FROM sums
        UNION ALL
        SELECT v, -1, -1, -1, -1, -1, -1
        FROM (VALUES ('bad-magic'), ('truncated')) t(v)
    """
    o["audio_spectral_peaks"] = """
        SELECT 'clip-' || i AS media_id,
               CAST(8000 AS INT) AS sample_rate_i,
               CAST(3 + i % 40 AS INT) AS peak_bin,
               CAST((3 + i % 40) * 78125 AS BIGINT) AS peak_hz_mi
        FROM range(120) t(i)
    """
    o["host_simrank_3"] = _simrank_sql(3, _host_edges_sql())
    o["event_markov_transitions"] = """
        WITH nxt AS (
          SELECT event_type AS src_type,
                 lead(event_type) OVER (PARTITION BY user_id
                                        ORDER BY ts, event_id) AS dst_type
          FROM events
        ),
        counts AS (
          SELECT src_type, dst_type, CAST(COUNT(*) AS BIGINT) AS n
          FROM nxt WHERE dst_type IS NOT NULL GROUP BY 1, 2
        ),
        totals AS (SELECT src_type, SUM(n) AS tot FROM counts GROUP BY 1)
        SELECT src_type, dst_type, n,
               CAST((n * 1000000) // tot AS BIGINT) AS p_mi
        FROM counts JOIN totals USING (src_type)
    """
    o["contrastive_triplets"] = (
        "WITH "
        + _minhash_cte()
        + """,
        sym AS (
          SELECT a AS anchor, b AS pos, jaccard_i FROM pairs
          UNION ALL SELECT b, a, jaccard_i FROM pairs
        ),
        best AS (
          SELECT anchor, pos FROM (
            SELECT *, row_number() OVER (PARTITION BY anchor
                        ORDER BY jaccard_i DESC, pos) AS rn FROM sym)
          WHERE rn = 1
        ),
        probe AS (
          SELECT doc_id AS cand FROM alld
          WHERE ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT % 37 = 0
        ),
        cand_pairs AS (
          SELECT b.anchor, b.pos, p.cand,
                 md5(b.anchor || ':' || p.cand) AS h
          FROM best b, probe p
          WHERE p.cand <> b.anchor AND p.cand <> b.pos
            AND NOT EXISTS (SELECT 1 FROM sym s
                            WHERE s.anchor = b.anchor AND s.pos = p.cand)
        )
        SELECT anchor, pos AS pos_id, cand AS neg_id FROM (
          SELECT *, row_number() OVER (PARTITION BY anchor ORDER BY h, cand) AS rn
          FROM cand_pairs)
        WHERE rn = 1
    """
    )
    o["epoch_budget_waterfill"] = """
        WITH src AS (
          SELECT 'src' || s AS source,
                 CAST(CASE WHEN s = 12 THEN 0
                      ELSE 1000 * (s + 1) + (s % 3) * 50 END AS BIGINT) AS n_tokens
          FROM range(13) t(s)
        ),
        base AS (SELECT *, CAST(n_tokens * 3 AS BIGINT) AS cap_tokens
                 FROM src WHERE n_tokens > 0),
        seq AS (
          SELECT *, row_number() OVER (ORDER BY cap_tokens, source) AS i,
                 coalesce(SUM(cap_tokens) OVER (ORDER BY cap_tokens, source
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS pprev,
                 COUNT(*) OVER () AS s_total
          FROM base
        ),
        flg AS (
          SELECT *, CASE WHEN cap_tokens * (s_total - i + 1) <= 40000 - pprev
                         THEN 1 ELSE 0 END AS capped
          FROM seq
        ),
        fill AS (
          SELECT SUM(capped) AS t_capped,
                 coalesce(SUM(CASE WHEN capped = 1 THEN cap_tokens END), 0) AS p_capped
          FROM flg
        ),
        alloc AS (
          SELECT flg.*, fill.t_capped, fill.p_capped,
                 CASE WHEN capped = 1 THEN cap_tokens
                      WHEN s_total > t_capped
                        THEN (40000 - p_capped) // (s_total - t_capped)
                      ELSE 0 END AS alloc_tokens
          FROM flg, fill
        )
        SELECT source, n_tokens, cap_tokens,
               CAST(alloc_tokens AS BIGINT) AS alloc_tokens,
               CAST(capped AS INT) AS capped,
               CAST(alloc_tokens * 10000 // n_tokens AS BIGINT) AS epochs_mi
        FROM alloc
        UNION ALL
        SELECT source, CAST(coalesce(n_tokens, 0) AS BIGINT), 0, 0, 0, 0
        FROM src WHERE n_tokens <= 0 OR n_tokens IS NULL
    """
    o["rrf_fusion_topk"] = """
        WITH idx AS (
          SELECT doc_id AS id, t.token, count(*) AS tf
          FROM documents,
               unnest(regexp_split_to_array(lower(trim(text)), '\\s+')) AS t(token)
          WHERE t.token <> ''
          GROUP BY 1, 2
        ),
        arm_a AS (
          SELECT id, row_number() OVER (ORDER BY score DESC, id) AS rank FROM (
            SELECT id, SUM(tf) AS score FROM idx
            WHERE token IN ('query', 'spark') GROUP BY id
            ORDER BY score DESC, id LIMIT 20)
        ),
        arm_b AS (
          SELECT id, row_number() OVER (ORDER BY score DESC, id) AS rank FROM (
            SELECT id, SUM(tf) AS score FROM idx
            WHERE token = 'data' GROUP BY id
            ORDER BY score DESC, id LIMIT 20)
        ),
        u AS (
          SELECT id, 1000000 // (60 + rank) AS rr FROM arm_a
          UNION ALL
          SELECT id, 1000000 // (60 + rank) FROM arm_b
        )
        SELECT id, CAST(SUM(rr) AS BIGINT) AS rrf_mi, CAST(COUNT(*) AS INT) AS n_arms
        FROM u GROUP BY id
        ORDER BY rrf_mi DESC, n_arms DESC, id LIMIT 15
    """
    o["collective_entity_linking"] = """
        WITH pri AS (
          SELECT 's' || k AS surface, 'A' || k AS entity, CAST(6000 AS BIGINT) AS prior_i
          FROM range(10) t(k)
          UNION ALL
          SELECT 's' || k, 'B' || k, 5000 FROM range(10) t(k)
        ),
        rel AS (
          SELECT least('B' || k, 'A' || (k + 1)) AS a,
                 greatest('B' || k, 'A' || (k + 1)) AS b,
                 CAST(9000 AS BIGINT) AS rel_i
          FROM range(9) t(k)
          UNION ALL
          SELECT least('A' || k, 'A' || (k + 1)), greatest('A' || k, 'A' || (k + 1)), 1000
          FROM range(9) t(k)
        ),
        men AS (
          SELECT 'd' || d AS doc, CAST(0 AS INT) AS mention_id,
                 's' || (d % 9) AS surface
          FROM range(60) t(d)
          UNION ALL
          SELECT 'd' || d, 1,
                 CASE WHEN d % 7 = 3 THEN 's' || (d % 9) ELSE 's' || (d % 9 + 1) END
          FROM range(60) t(d) WHERE d % 5 <> 0
        ),
        top1 AS (
          SELECT surface, entity AS ctx_entity FROM (
            SELECT *, row_number() OVER (PARTITION BY surface
                        ORDER BY prior_i DESC, entity) AS rn FROM pri)
          WHERE rn = 1
        ),
        ctx AS (
          SELECT m.doc, m.mention_id AS ctx_mid, t.ctx_entity
          FROM men m JOIN top1 t USING (surface)
        ),
        cands AS (
          SELECT m.doc, m.mention_id, m.surface, p.entity, p.prior_i
          FROM men m JOIN pri p USING (surface)
        ),
        pairs AS (
          SELECT c.doc, c.mention_id, c.entity, x.ctx_entity,
                 least(c.entity, x.ctx_entity) AS pa,
                 greatest(c.entity, x.ctx_entity) AS pb
          FROM (SELECT doc, mention_id, entity FROM cands) c
          JOIN ctx x USING (doc)
          WHERE c.mention_id <> x.ctx_mid
        ),
        coh AS (
          SELECT doc, mention_id, entity,
                 SUM(CASE WHEN entity = ctx_entity THEN 10000
                          ELSE coalesce(r.rel_i, 0) END) AS c
          FROM pairs LEFT JOIN rel r ON r.a = pairs.pa AND r.b = pairs.pb
          GROUP BY 1, 2, 3
        ),
        sc AS (
          SELECT c.doc, c.mention_id, c.surface, c.entity,
                 CAST(c.prior_i + coalesce(h.c, 0) AS BIGINT) AS score_i
          FROM cands c LEFT JOIN coh h USING (doc, mention_id, entity)
        )
        SELECT doc, mention_id, surface, entity, score_i FROM (
          SELECT *, row_number() OVER (PARTITION BY doc, mention_id
                      ORDER BY score_i DESC, entity) AS rn FROM sc)
        WHERE rn = 1
    """
    o["span_corruption_t5"] = """
        WITH toks AS (
          SELECT doc_id, s.tok AS tok, CAST(s.i - 1 AS BIGINT) AS i
          FROM (
            SELECT doc_id,
                   unnest(list_transform(
                     list_filter(regexp_split_to_array(trim(text), '\\s+'),
                                 x -> x <> ''),
                     (x, j) -> struct_pack(tok := x, i := j))) AS s
            FROM documents)
        ),
        m AS (
          SELECT doc_id, i, tok,
                 (('0x' || substr(md5(doc_id || ':' || i), 1, 4))::BIGINT % 100) < 15
                   AS msk
          FROM toks
        ),
        r AS (
          SELECT *, CASE WHEN msk AND NOT coalesce(
                   lag(msk) OVER (PARTITION BY doc_id ORDER BY i), false)
                 THEN 1 ELSE 0 END AS rs
          FROM m
        ),
        s AS (
          SELECT *, SUM(rs) OVER (PARTITION BY doc_id ORDER BY i) - 1 AS sid FROM r
        ),
        agg AS (
          SELECT doc_id,
            string_agg(CASE WHEN NOT msk THEN tok
                            ELSE '<extra_id_' || sid || '>' END, ' ' ORDER BY i)
              FILTER (WHERE NOT msk OR rs = 1) AS input_text,
            string_agg(CASE WHEN rs = 1 THEN '<extra_id_' || sid || '> ' || tok
                            ELSE tok END, ' ' ORDER BY i)
              FILTER (WHERE msk) AS target_text,
            CAST(SUM(CASE WHEN msk THEN 1 ELSE 0 END) AS INT) AS n_masked
          FROM s GROUP BY doc_id
        )
        SELECT d.doc_id, coalesce(a.input_text, '') AS input_text,
               coalesce(a.target_text, '') AS target_text,
               coalesce(a.n_masked, 0) AS n_masked
        FROM documents d LEFT JOIN agg a USING (doc_id)
    """
    o["annotator_agreement_kappa"] = """
        WITH l AS (
          SELECT 'c' || (doc_id % 4) AS a,
                 CASE WHEN doc_id % 10 < 7 THEN 'c' || (doc_id % 4)
                      ELSE 'c' || ((doc_id + 1) % 4) END AS b
          FROM documents
        ),
        flip AS (
          SELECT 'c' || (doc_id % 4) AS a, 'c' || ((doc_id + 1) % 4) AS b
          FROM documents
        ),
        k1 AS (
          SELECT CAST(COUNT(*) AS BIGINT) AS n,
                 CAST(SUM(CASE WHEN a = b THEN 1 ELSE 0 END) AS BIGINT) AS agree,
                 (SELECT SUM(r.cnt * c.cnt) FROM
                    (SELECT a AS k, COUNT(*) AS cnt FROM l GROUP BY a) r
                    JOIN (SELECT b AS k, COUNT(*) AS cnt FROM l GROUP BY b) c
                    USING (k)) AS rc
          FROM l
        ),
        k2 AS (
          SELECT CAST(COUNT(*) AS BIGINT) AS n,
                 CAST(SUM(CASE WHEN a = b THEN 1 ELSE 0 END) AS BIGINT) AS agree,
                 (SELECT SUM(r.cnt * c.cnt) FROM
                    (SELECT a AS k, COUNT(*) AS cnt FROM flip GROUP BY a) r
                    JOIN (SELECT b AS k, COUNT(*) AS cnt FROM flip GROUP BY b) c
                    USING (k)) AS rc
          FROM flip
        )
        SELECT 'panel' AS arm, n, agree,
               CAST((10000 * (n * agree - rc)) // (n * n - rc) AS BIGINT) AS kappa_mi
        FROM k1
        UNION ALL
        SELECT 'anti', n, agree,
               CAST((10000 * (n * agree - rc)) // (n * n - rc) AS BIGINT)
        FROM k2
    """
    o["kg_scd2_from_crawl"] = """
        WITH facts AS (
          SELECT 'Entity_' || (doc_id % 37) AS subj, 'based_in' AS pred,
                 'City' || ((doc_id * 3) % 13) AS obj,
                 CAST(1990 + doc_id % 30 AS BIGINT) AS ts
          FROM documents
        ),
        changes AS (
          SELECT subj, pred, ts, min(obj) AS obj FROM facts GROUP BY 1, 2, 3
        ),
        seq AS (
          SELECT *, lag(obj) OVER (PARTITION BY subj, pred ORDER BY ts) AS prev
          FROM changes
        ),
        eff AS (
          SELECT subj, pred, obj, ts FROM seq
          WHERE prev IS NULL OR prev <> obj
        )
        SELECT subj, pred, obj, ts AS valid_from,
               CAST(coalesce(
                 lead(ts) OVER (PARTITION BY subj, pred ORDER BY ts), -1
               ) AS BIGINT) AS valid_to_s
        FROM eff
    """
    o["spell_correct_terms"] = """
        WITH idx AS (
          SELECT doc_id AS id, t.token, count(*) AS tf
          FROM documents,
               unnest(regexp_split_to_array(lower(trim(text)), '\\s+')) AS t(token)
          WHERE t.token <> ''
          GROUP BY 1, 2
        ),
        vocab AS (SELECT token, CAST(SUM(tf) AS BIGINT) AS freq FROM idx GROUP BY 1),
        q(term) AS (SELECT * FROM (VALUES ('data'), ('qeury'), ('sparc'), ('zzzzqx'))),
        cands AS (
          SELECT q.term, v.token, CAST(levenshtein(v.token, q.term) AS INT) AS edits,
                 v.freq
          FROM vocab v, q
          WHERE abs(length(v.token) - length(q.term)) <= 2
            AND levenshtein(v.token, q.term) <= 2
        )
        SELECT term, token AS suggestion, edits, freq FROM (
          SELECT *, row_number() OVER (PARTITION BY term
                      ORDER BY edits, freq DESC, token) AS rn
          FROM cands) WHERE rn = 1
    """
    o["entity_relatedness_mw"] = f"""
        WITH t AS MATERIALIZED ({_kg_e2e_sql()}),
        ed AS (SELECT DISTINCT url AS key, subj AS item FROM t),
        nk AS (SELECT CAST(COUNT(DISTINCT key) AS BIGINT) AS n_keys FROM ed),
        small AS (SELECT key FROM (SELECT key, count(*) AS c FROM ed GROUP BY key)
                  WHERE c <= 1000),
        d AS (SELECT ed.key, ed.item FROM ed JOIN small USING (key)),
        deg AS (SELECT item, CAST(count(*) AS BIGINT) AS deg FROM d GROUP BY item),
        p AS (SELECT l.item AS a, r.item AS b, CAST(count(*) AS BIGINT) AS n_common
              FROM d l JOIN d r ON r.key = l.key AND l.item < r.item
              GROUP BY 1, 2)
        SELECT p.a, p.b, p.n_common, da.deg AS deg_a, db.deg AS deg_b,
               CASE WHEN ln(n_keys) = ln(least(da.deg, db.deg)) THEN -1
                    ELSE greatest(0, CAST(round(10000 * (
                      1.0 - (ln(greatest(da.deg, db.deg)) - ln(p.n_common))
                            / (ln(n_keys) - ln(least(da.deg, db.deg)))
                    )) AS BIGINT)) END AS mw_mi
        FROM p JOIN deg da ON da.item = p.a JOIN deg db ON db.item = p.b
        CROSS JOIN nk
    """
    o["tpch_q5_local_supplier"] = """
        SELECT n_name,
               CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) AS BIGINT) AS revenue_ci
        FROM customer
        JOIN orders ON c_custkey = o_custkey
        JOIN lineitem ON l_orderkey = o_orderkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation ON s_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        WHERE r_name = 'ASIA'
          AND c_nationkey = s_nationkey
          AND o_orderdate >= TIMESTAMP '1996-01-01'
          AND o_orderdate < TIMESTAMP '1998-01-01'
        GROUP BY n_name
        ORDER BY revenue_ci DESC, n_name
    """
    o["tpch_q7_volume_shipping"] = """
        SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
               CAST(year(l_shipdate) AS BIGINT) AS l_year,
               CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) AS BIGINT) AS revenue_ci
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation n1 ON s_nationkey = n1.n_nationkey
        JOIN nation n2 ON c_nationkey = n2.n_nationkey
        WHERE ((n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_8')
            OR (n1.n_name = 'NATION_8' AND n2.n_name = 'NATION_3'))
          AND l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate < TIMESTAMP '1998-01-01'
        GROUP BY 1, 2, 3
        ORDER BY supp_nation, cust_nation, l_year
    """
    o["tpch_q8_market_share"] = """
        WITH rev AS (
          SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
                 CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT) AS cents,
                 n1.n_name AS supp_nation
          FROM lineitem
          JOIN orders ON l_orderkey = o_orderkey
          JOIN customer ON o_custkey = c_custkey
          JOIN nation n2 ON c_nationkey = n2.n_nationkey
          JOIN region ON n2.n_regionkey = r_regionkey
          JOIN supplier ON l_suppkey = s_suppkey
          JOIN nation n1 ON s_nationkey = n1.n_nationkey
          JOIN part ON l_partkey = p_partkey
          WHERE r_name = 'EUROPE' AND p_type = 'ECONOMY'
            AND o_orderdate >= TIMESTAMP '1996-01-01'
            AND o_orderdate < TIMESTAMP '1998-01-01'
        )
        SELECT o_year,
               CAST(sum(CASE WHEN supp_nation = 'NATION_3' THEN cents ELSE 0 END) AS BIGINT) AS nation_ci,
               CAST(sum(cents) AS BIGINT) AS total_ci,
               CAST(coalesce(sum(CASE WHEN supp_nation = 'NATION_3' THEN cents ELSE 0 END) * 10000
                    // sum(cents), -1) AS BIGINT) AS mkt_share_bp
        FROM rev GROUP BY o_year ORDER BY o_year
    """
    o["tpch_q11_important_value"] = """
        WITH val AS (
          SELECT l_partkey AS p_partkey,
                 CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) AS BIGINT) AS value_ci
          FROM lineitem
          JOIN supplier ON l_suppkey = s_suppkey
          JOIN nation ON s_nationkey = n_nationkey
          JOIN region ON n_regionkey = r_regionkey
          WHERE r_name = 'EUROPE'
          GROUP BY 1
        )
        SELECT p_partkey, value_ci
        FROM val
        WHERE value_ci * (SELECT count(*) FROM val) * 2
              > 3 * (SELECT sum(value_ci) FROM val)
        ORDER BY value_ci DESC, p_partkey
    """
    o["tpch_q15_top_supplier"] = """
        WITH rev AS (
          SELECT l_suppkey AS s_suppkey,
                 CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) AS BIGINT) AS total_rev_ci
          FROM lineitem
          WHERE l_shipdate >= TIMESTAMP '1997-01-01'
            AND l_shipdate < TIMESTAMP '1997-04-01'
          GROUP BY 1
        )
        SELECT s.s_suppkey, s.s_name, r.total_rev_ci
        FROM rev r JOIN supplier s ON r.s_suppkey = s.s_suppkey
        WHERE r.total_rev_ci = (SELECT max(total_rev_ci) FROM rev)
        ORDER BY s.s_suppkey
    """
    o["tpch_q16_supplier_part_cnt"] = """
        SELECT p_brand, p_type, CAST(p_size AS BIGINT) AS p_size,
               CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
        FROM part JOIN lineitem ON p_partkey = l_partkey
        WHERE p_brand <> 'Brand#1' AND p_type <> 'PROMO'
          AND p_size IN (1, 2, 3, 4, 5, 6, 7, 8)
        GROUP BY 1, 2, 3
        ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
    """
    o["tpch_q17_small_qty_revenue"] = """
        WITH pl AS (
          SELECT l_partkey, CAST(l_quantity AS BIGINT) AS qty,
                 CAST(round(l_extendedprice * 100) AS BIGINT) AS cents
          FROM lineitem JOIN part ON l_partkey = p_partkey
          WHERE p_brand = 'Brand#3'
        ),
        pa AS (
          SELECT l_partkey, CAST(count(*) AS BIGINT) AS cnt,
                 CAST(sum(qty) AS BIGINT) AS sumq
          FROM pl GROUP BY 1
        )
        SELECT CAST(coalesce(sum(pl.cents), 0) // 7 AS BIGINT) AS avg_yearly_ci,
               CAST(count(*) AS BIGINT) AS n_lines
        FROM pl JOIN pa ON pl.l_partkey = pa.l_partkey
        WHERE 2 * pl.qty * pa.cnt < pa.sumq
    """
    o["tpch_q21_waiting_supplier"] = """
        SELECT s_name, CAST(count(*) AS BIGINT) AS numwait
        FROM lineitem l1
        JOIN orders ON l1.l_orderkey = o_orderkey
        JOIN supplier ON l1.l_suppkey = s_suppkey
        WHERE o_orderstatus = 'F'
          AND l1.l_shipdate > o_orderdate + INTERVAL 60 DAY
          AND EXISTS (
            SELECT 1 FROM lineitem l2
            WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
          AND NOT EXISTS (
            SELECT 1 FROM lineitem l3
            JOIN orders o3 ON l3.l_orderkey = o3.o_orderkey
            WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
              AND l3.l_shipdate > o3.o_orderdate + INTERVAL 60 DAY)
        GROUP BY s_name
        ORDER BY numwait DESC, s_name
        LIMIT 20
    """
    o["bitext_margin_mine"] = """
        WITH n AS (
          SELECT vec_id, embedding::DOUBLE[] AS e,
                 sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS nrm
          FROM embeddings
        ),
        fp AS (
          SELECT vec_id,
                 list_transform(e, x -> CAST(round((x / nrm) * 10000) AS BIGINT)) AS fp
          FROM n WHERE nrm > 0
        ),
        p AS (
          SELECT a.vec_id AS src, b.vec_id AS dst,
                 CAST(list_dot_product(a.fp::DOUBLE[], b.fp::DOUBLE[]) AS BIGINT) AS dot_i
          FROM fp a, fp b
          WHERE a.vec_id % 2 = 0 AND b.vec_id % 2 = 1
        ),
        ks AS (
          SELECT src, dst, dot_i,
                 row_number() OVER (PARTITION BY src ORDER BY dot_i DESC, dst) AS rs,
                 row_number() OVER (PARTITION BY dst ORDER BY dot_i DESC, src) AS rd
          FROM p
        ),
        ssrc AS (SELECT src, CAST(sum(dot_i) AS BIGINT) AS sumk_src
                 FROM ks WHERE rs <= 4 GROUP BY 1),
        sdst AS (SELECT dst, CAST(sum(dot_i) AS BIGINT) AS sumk_dst
                 FROM ks WHERE rd <= 4 GROUP BY 1),
        m AS (
          SELECT p.src, p.dst,
                 CAST((p.dot_i * 80000) // (sumk_src + sumk_dst) AS BIGINT) AS margin_bp
          FROM p JOIN ssrc ON p.src = ssrc.src JOIN sdst ON p.dst = sdst.dst
          WHERE sumk_src + sumk_dst > 0
        ),
        best AS (
          SELECT src, dst, margin_bp,
                 row_number() OVER (PARTITION BY src ORDER BY margin_bp DESC, dst) AS rf,
                 row_number() OVER (PARTITION BY dst ORDER BY margin_bp DESC, src) AS rb
          FROM m
        )
        SELECT src, dst, margin_bp
        FROM best
        WHERE rf = 1 AND rb = 1 AND margin_bp >= 10000
        ORDER BY src
    """
    o["tpch_q2_min_cost_supplier"] = """
        WITH esup AS (
          SELECT s_suppkey, s_name, n_name,
                 CAST(round(s_acctbal * 100) AS BIGINT) AS acctbal_ci
          FROM supplier JOIN nation ON s_nationkey = n_nationkey
          JOIN region ON n_regionkey = r_regionkey
          WHERE r_name = 'EUROPE'
        ),
        sp AS (SELECT p_partkey FROM part WHERE p_type = 'SMALL' AND p_size <= 10),
        offers AS (
          SELECT sp.p_partkey, l_suppkey,
                 CAST(min(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS offer_ci
          FROM lineitem
          JOIN sp ON l_partkey = sp.p_partkey
          JOIN esup ON l_suppkey = esup.s_suppkey
          GROUP BY 1, 2
        ),
        pm AS (SELECT p_partkey, min(offer_ci) AS min_ci FROM offers GROUP BY 1)
        SELECT e.acctbal_ci, e.s_name, e.n_name, o.p_partkey, o.offer_ci
        FROM offers o
        JOIN pm ON o.p_partkey = pm.p_partkey AND o.offer_ci = pm.min_ci
        JOIN esup e ON o.l_suppkey = e.s_suppkey
        ORDER BY acctbal_ci DESC, s_name, o.p_partkey
        LIMIT 100
    """
    o["tpch_q9_product_profit"] = """
        SELECT n_name AS nation,
               CAST(year(o_orderdate) AS BIGINT) AS o_year,
               CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)
                        - CAST(l_quantity AS BIGINT)
                          * CAST(round(p_retailprice * 50) AS BIGINT)) AS BIGINT) AS profit_ci
        FROM lineitem
        JOIN part ON l_partkey = p_partkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation ON s_nationkey = n_nationkey
        JOIN orders ON l_orderkey = o_orderkey
        WHERE p_name LIKE '%widget%'
        GROUP BY 1, 2
        ORDER BY nation, o_year DESC
    """
    o["tpch_q20_part_promotion"] = """
        WITH red AS (SELECT p_partkey FROM part WHERE p_name LIKE 'red %'),
        li97 AS (
          SELECT l_partkey, l_suppkey, CAST(l_quantity AS BIGINT) AS qty
          FROM lineitem JOIN red ON l_partkey = red.p_partkey
          WHERE l_shipdate >= TIMESTAMP '1997-01-01'
            AND l_shipdate < TIMESTAMP '1998-01-01'
        ),
        sp AS (SELECT l_partkey, l_suppkey, CAST(sum(qty) AS BIGINT) AS sp_qty
               FROM li97 GROUP BY 1, 2),
        tot AS (SELECT l_partkey, CAST(sum(qty) AS BIGINT) AS total_qty
                FROM li97 GROUP BY 1),
        qual AS (
          SELECT DISTINCT sp.l_suppkey FROM sp
          JOIN tot ON sp.l_partkey = tot.l_partkey
          WHERE 2 * sp_qty > total_qty
        )
        SELECT s_suppkey, s_name
        FROM supplier
        JOIN nation ON s_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        WHERE r_name = 'EUROPE'
          AND EXISTS (SELECT 1 FROM qual WHERE qual.l_suppkey = s_suppkey)
        ORDER BY s_suppkey
    """
    o["gini_source_concentration"] = """
        WITH mass AS (
          SELECT source, CAST(sum(coalesce(n_chars, 0)) AS BIGINT) AS mass
          FROM documents GROUP BY 1
        ),
        ranked AS (
          SELECT source, mass,
                 row_number() OVER (ORDER BY mass, source NULLS FIRST) AS rnk,
                 CAST(sum(mass) OVER (ORDER BY mass, source NULLS FIRST
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
          FROM mass
        ),
        tot AS (
          SELECT CAST(count(*) AS BIGINT) AS n_src,
                 CAST(sum(mass) AS BIGINT) AS tot_mass,
                 CAST(sum(rnk * mass) AS BIGINT) AS weighted
          FROM ranked
        )
        SELECT CAST(rnk AS BIGINT) AS rnk, source, mass,
               CAST((10000 * cum) // greatest(tot_mass, 1) AS BIGINT) AS cum_share_bp,
               CAST((10000 * (2 * weighted - (n_src + 1) * tot_mass))
                    // greatest(n_src * tot_mass, 1) AS BIGINT) AS gini_bp
        FROM ranked, tot
        ORDER BY rnk
    """
    o["wilson_conversion_rank"] = """
        WITH agg AS (
          SELECT user_id,
                 CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS pos,
                 CAST(count(*) AS BIGINT) AS n
          FROM events
          WHERE event_type IN ('view', 'purchase')
          GROUP BY 1
        )
        SELECT user_id, pos, n,
               CAST(floor(1000000 * ((CAST(pos AS DOUBLE) + 1.9208
                    - 1.96 * sqrt((CAST(pos AS DOUBLE) * CAST(n - pos AS DOUBLE))
                                  / CAST(n AS DOUBLE) + 0.9604))
                    / (CAST(n AS DOUBLE) + 3.8416))) AS BIGINT) AS wilson_lb_u
        FROM agg
        ORDER BY wilson_lb_u DESC, user_id
        LIMIT 20
    """
    o["burrows_delta_attribution"] = """
        WITH toks AS (
          SELECT doc_id, unnest(string_split_regex(lower(coalesce(text, '')), '[^a-z]+')) AS tok
          FROM documents
        ),
        toks2 AS (SELECT doc_id, tok FROM toks WHERE tok <> ''),
        total AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tok FROM toks2 GROUP BY 1),
        fw(word) AS (VALUES ('the'),('of'),('and'),('to'),('a'),('in'),('is'),('that'),('it'),('as')),
        cnts AS (
          SELECT doc_id, tok AS word, CAST(count(*) AS BIGINT) AS cnt
          FROM toks2 WHERE tok IN (SELECT word FROM fw) GROUP BY 1, 2
        ),
        rates AS (
          SELECT t.doc_id, fw.word,
                 CAST((1000 * coalesce(c.cnt, 0)) // t.n_tok AS BIGINT) AS rate
          FROM total t CROSS JOIN fw
          LEFT JOIN cnts c ON c.doc_id = t.doc_id AND c.word = fw.word
          WHERE t.n_tok > 0
        ),
        stats AS (
          SELECT word, CAST(count(*) AS BIGINT) AS n,
                 CAST(sum(rate) AS BIGINT) AS s,
                 CAST(sum(rate * rate) AS BIGINT) AS q
          FROM rates GROUP BY 1
        ),
        vstats AS (
          SELECT word, n, CAST(n * q - s * s AS BIGINT) AS vnum
          FROM stats WHERE n * q - s * s > 0
        ),
        pairs AS (
          SELECT a.doc_id AS qid, b.doc_id AS oid, a.word,
                 abs(a.rate - b.rate) AS diff
          FROM rates a JOIN rates b ON a.word = b.word AND a.doc_id <> b.doc_id
          WHERE a.doc_id < 3
        ),
        terms AS (
          SELECT p.qid, p.oid,
                 CAST(floor(1000000 * (CAST(p.diff AS DOUBLE) * CAST(v.n AS DOUBLE)
                      / sqrt(CAST(v.vnum AS DOUBLE)))) AS BIGINT) AS term_u
          FROM pairs p JOIN vstats v ON p.word = v.word
        ),
        delta AS (
          SELECT qid, oid, CAST(sum(term_u) AS BIGINT) AS delta_u
          FROM terms GROUP BY 1, 2
        ),
        rk AS (
          SELECT qid, oid, delta_u,
                 row_number() OVER (PARTITION BY qid ORDER BY delta_u, oid) AS r
          FROM delta
        )
        SELECT qid, oid, delta_u FROM rk WHERE r <= 5 ORDER BY qid, delta_u, oid
    """
    o["tpch_q4_priority_exists"] = """
        SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS order_count
        FROM orders o
        WHERE o_orderdate >= TIMESTAMP '1997-01-01'
          AND o_orderdate < TIMESTAMP '1997-10-01'
          AND EXISTS (
            SELECT 1 FROM lineitem l
            WHERE l.l_orderkey = o.o_orderkey AND l.l_shipdate > o.o_orderdate
          )
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority
    """
    o["tpch_q6_forecast_revenue"] = """
        SELECT CAST(sum(CAST(round(l_extendedprice * l_discount * 100) AS BIGINT)) AS BIGINT) AS revenue_ci,
               CAST(count(*) AS BIGINT) AS n_lines
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1997-01-01'
          AND l_shipdate < TIMESTAMP '1998-01-01'
          AND l_discount >= 0.05 AND l_discount <= 0.07
          AND l_quantity < 24
    """
    o["tpch_q10_returned_items"] = """
        SELECT c_custkey, c_name, n_name,
               CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) AS BIGINT) AS revenue_ci
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        WHERE l_returnflag = 'R'
          AND o_orderdate >= TIMESTAMP '1997-01-01'
          AND o_orderdate < TIMESTAMP '1997-04-01'
        GROUP BY c_custkey, c_name, n_name
        ORDER BY revenue_ci DESC, c_custkey LIMIT 20
    """
    o["tpch_q14_promo_share"] = """
        WITH agg AS (
          SELECT
            CAST(sum(CASE WHEN p_type = 'PROMO'
                 THEN CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)
                 ELSE 0 END) AS BIGINT) AS promo_ci,
            CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) AS BIGINT) AS total_ci
          FROM lineitem JOIN part ON l_partkey = p_partkey
          WHERE l_shipdate >= TIMESTAMP '1997-03-01'
            AND l_shipdate < TIMESTAMP '1997-06-01'
        )
        SELECT promo_ci, total_ci,
               CAST(promo_ci * 10000 // total_ci AS BIGINT) AS promo_share_bp
        FROM agg
    """
    o["tpch_q18_big_orders"] = """
        WITH big AS (
          SELECT l_orderkey, CAST(round(sum(l_quantity)) AS BIGINT) AS sum_qty
          FROM lineitem GROUP BY l_orderkey
          HAVING CAST(round(sum(l_quantity)) AS BIGINT) > 200
        )
        SELECT c_name, c_custkey, o_orderkey,
               strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate_s,
               CAST(round(o_totalprice * 100) AS BIGINT) AS totalprice_ci,
               sum_qty
        FROM orders
        JOIN big ON o_orderkey = l_orderkey
        JOIN customer ON o_custkey = c_custkey
        ORDER BY totalprice_ci DESC, o_orderkey LIMIT 100
    """
    o["kg_construct_derived"] = f"""
        WITH t AS MATERIALIZED ({_kg_e2e_sql()}),
        b AS (
          SELECT DISTINCT a.subj AS y, a.obj AS x, l.obj AS city
          FROM t a JOIN t l ON l.pred = 'based_in' AND l.subj = a.obj
          WHERE a.pred = 'acquired'
        )
        SELECT DISTINCT subj, pred, obj FROM (
          SELECT y AS subj, 'controls' AS pred, x AS obj FROM b
          UNION ALL SELECT y, 'has_presence_in', city FROM b
          UNION ALL SELECT x, 'located_in', city FROM b
        )
    """
    o["wand_topk_pruned"] = """
        WITH idx AS (
          SELECT doc_id AS id, t.token, count(*) AS tf
          FROM documents,
               unnest(regexp_split_to_array(lower(trim(text)), '\\s+')) AS t(token)
          WHERE t.token <> ''
          GROUP BY 1, 2
        ),
        dl AS (SELECT id, CAST(SUM(tf) AS BIGINT) AS dl FROM idx GROUP BY 1),
        q(token, w) AS (
          SELECT * FROM (VALUES ('data', 20), ('query', 30), ('spark', 40), ('the', 5))
        ),
        s AS (
          SELECT id, SUM(tf * w) AS s, CAST(COUNT(DISTINCT token) AS INT) AS n_terms
          FROM idx JOIN q USING (token) GROUP BY id
        )
        SELECT id, CAST((s * 10000) // (50 + dl) AS BIGINT) AS score_i, n_terms
        FROM s JOIN dl USING (id)
        ORDER BY score_i DESC, id LIMIT 15
    """
    o["ir_ranking_eval"] = """
        WITH w(r, w) AS (
          SELECT * FROM (VALUES (1,10000),(2,6309),(3,5000),(4,4307),(5,3869),
                                (6,3562),(7,3333),(8,3155),(9,3010),(10,2891))
        ),
        res AS (
          SELECT q.i AS query_id, 'd' || ((q.i*13 + r.r*7) % 50) AS doc_id, r.r AS rank
          FROM range(30) q(i), range(1, 11) r(r)
        ),
        qr AS (
          SELECT q.i AS query_id,
                 'd' || ((q.i*13 + g.g*7 + ((g.g + q.i) % 2) * 25) % 50) AS doc_id,
                 ((q.i + g.g) % 3) + 1 AS gain
          FROM range(30) q(i), range(1, 6) g(g)
        ),
        hit AS (
          SELECT res.query_id, res.rank, qr.gain
          FROM res JOIN qr USING (query_id, doc_id)
        ),
        got AS (
          SELECT query_id, SUM(gain * w.w) AS dcg,
                 SUM(CASE WHEN gain > 0 THEN 1 ELSE 0 END) AS hits,
                 MIN(CASE WHEN gain > 0 THEN rank END) AS first_rel
          FROM hit JOIN w ON w.r = hit.rank GROUP BY 1
        ),
        ideal AS (
          SELECT query_id, SUM(gain * w.w) AS ideal FROM (
            SELECT query_id, gain, doc_id,
                   row_number() OVER (PARTITION BY query_id
                                      ORDER BY gain DESC, doc_id) AS ir
            FROM qr) t JOIN w ON w.r = t.ir
          WHERE ir <= 10 GROUP BY 1
        ),
        ng AS (SELECT query_id, COUNT(*) AS n_gold FROM qr WHERE gain > 0 GROUP BY 1)
        SELECT ideal.query_id, CAST(coalesce(n_gold, 0) AS BIGINT) AS n_gold,
               CAST(coalesce(hits, 0) AS BIGINT) AS hits,
               CAST(CASE WHEN ideal > 0 THEN coalesce(dcg, 0) * 10000 // ideal
                    ELSE -1 END AS BIGINT) AS ndcg_mi,
               CAST(CASE WHEN first_rel IS NOT NULL THEN 10000 // first_rel
                    ELSE 0 END AS BIGINT) AS rr_mi,
               CAST(CASE WHEN coalesce(n_gold, 0) > 0
                    THEN coalesce(hits, 0) * 10000 // n_gold
                    ELSE -1 END AS BIGINT) AS recall_mi
        FROM ideal LEFT JOIN ng USING (query_id) LEFT JOIN got USING (query_id)
    """
    o["kg_scd2_history"] = """
        WITH open_v AS (
          SELECT 'E' || i AS subj, 'color' AS pred, 'c' || (i % 5) AS obj,
                 CAST(i + 100 AS BIGINT) AS valid_from
          FROM range(60) t(i)
        ),
        closed_v AS (
          SELECT 'E' || i AS subj, 'color' AS pred, 'old' || i AS obj,
                 CAST(i AS BIGINT) AS valid_from, CAST(i + 100 AS BIGINT) AS valid_to
          FROM range(60) t(i) WHERE i % 4 = 0
        ),
        batch AS (
          SELECT 'E' || (CASE WHEN d < 120 THEN d % 40 WHEN d < 140 THEN d - 120
                              ELSE (d - 140) * 6 END) AS subj,
                 'color' AS pred,
                 CASE WHEN d < 120 THEN 'c' || ((d % 40 + d // 40) % 5)
                      WHEN d < 140 THEN 'c' || ((d - 120 + 2) % 5)
                      ELSE 'stale' END AS obj,
                 CAST(CASE WHEN d < 120 THEN 200 + d WHEN d < 140 THEN 320 + (d - 120)
                      ELSE 50 END AS BIGINT) AS ts
          FROM range(146) t(d)
        ),
        fresh AS (
          SELECT b.*, o.obj AS cur, o.valid_from AS cur_from
          FROM batch b LEFT JOIN open_v o USING (subj, pred)
          WHERE o.valid_from IS NULL OR b.ts > o.valid_from
        ),
        seq AS (
          SELECT *, lag(obj) OVER (PARTITION BY subj, pred ORDER BY ts, obj) AS prev
          FROM fresh
        ),
        eff AS (
          SELECT subj, pred, obj, ts FROM seq
          WHERE CASE WHEN prev IS NOT NULL THEN prev <> obj
                     ELSE cur IS NULL OR cur <> obj END
        ),
        new_versions AS (
          SELECT subj, pred, obj, ts AS valid_from,
                 lead(ts) OVER (PARTITION BY subj, pred ORDER BY ts, obj) AS valid_to
          FROM eff
        ),
        first_change AS (
          SELECT subj, pred, min(ts) AS first_ts FROM eff GROUP BY 1, 2
        ),
        open_updated AS (
          SELECT o.subj, o.pred, o.obj, o.valid_from, f.first_ts AS valid_to
          FROM open_v o LEFT JOIN first_change f USING (subj, pred)
        ),
        merged AS (
          SELECT subj, pred, obj, valid_from, valid_to FROM closed_v
          UNION ALL SELECT * FROM open_updated
          UNION ALL SELECT * FROM new_versions
        )
        SELECT subj, pred, obj, valid_from,
               CAST(coalesce(valid_to, -1) AS BIGINT) AS valid_to_s
        FROM merged
    """
    o["copula_isa_polarity"] = """
        WITH s AS (
          SELECT doc_id, CAST(doc_id AS VARCHAR) AS i,
                 CASE doc_id % 8
                   WHEN 0 THEN 'Acme' || doc_id || ' Corp is a vendor.'
                   WHEN 1 THEN 'Beta' || doc_id || ' Ltd is not a vendor.'
                   WHEN 2 THEN 'Gamma' || doc_id || ' was never a data broker.'
                   WHEN 3 THEN 'Delta' || doc_id || ' isn''t a supplier.'
                   WHEN 4 THEN 'Epsilon' || doc_id || ' is no longer a partner, sadly.'
                   WHEN 5 THEN 'Zeta' || doc_id || ' Group is a fast-growing startup.'
                   WHEN 6 THEN 'Eta' || doc_id || ' is an engineer.'
                   ELSE 'Theta' || doc_id || ' has a vendor line and no copula'
                 END AS sent
          FROM documents
        ),
        e AS (
          SELECT i AS url,
                 regexp_extract(sent, '((?:[A-Z][A-Za-z0-9_]*)(?: (?:[A-Z][A-Za-z0-9_]*|[0-9]+))*) (?:is|was|are|were)( not| never| no longer|n''t)? an? ((?:[a-z][a-z\\-]* )*[a-z][a-z\\-]*)[.,;!?]', 1) AS subj,
                 regexp_extract(sent, '((?:[A-Z][A-Za-z0-9_]*)(?: (?:[A-Z][A-Za-z0-9_]*|[0-9]+))*) (?:is|was|are|were)( not| never| no longer|n''t)? an? ((?:[a-z][a-z\\-]* )*[a-z][a-z\\-]*)[.,;!?]', 2) AS neg,
                 regexp_extract(sent, '((?:[A-Z][A-Za-z0-9_]*)(?: (?:[A-Z][A-Za-z0-9_]*|[0-9]+))*) (?:is|was|are|were)( not| never| no longer|n''t)? an? ((?:[a-z][a-z\\-]* )*[a-z][a-z\\-]*)[.,;!?]', 3) AS phrase
          FROM s
          WHERE regexp_matches(sent, '((?:[A-Z][A-Za-z0-9_]*)(?: (?:[A-Z][A-Za-z0-9_]*|[0-9]+))*) (?:is|was|are|were)( not| never| no longer|n''t)? an? ((?:[a-z][a-z\\-]* )*[a-z][a-z\\-]*)[.,;!?]')
        )
        SELECT url, subj, 'is_a' AS pred,
               (string_split(phrase, ' '))[-1] AS obj,
               CASE WHEN trim(neg) = '' THEN 'pos' ELSE 'neg' END AS polarity,
               phrase
        FROM e
    """
    o["prf_query_expansion"] = """
        WITH idx AS (
          SELECT doc_id AS id, t.token, count(*) AS tf
          FROM documents,
               unnest(regexp_split_to_array(lower(trim(text)), '\\s+')) AS t(token)
          WHERE t.token <> ''
          GROUP BY 1, 2
        ),
        fb AS (
          SELECT id FROM (
            SELECT id, sum(tf) AS score
            FROM idx WHERE token IN ('query', 'spark') GROUP BY id
          ) ORDER BY score DESC, id LIMIT 10
        )
        SELECT token, CAST(sum(tf) AS BIGINT) AS score,
               CAST(count(DISTINCT id) AS INT) AS df_fb
        FROM idx JOIN fb USING (id)
        WHERE length(token) >= 3 AND token NOT IN ('query', 'spark', 'the', 'a')
        GROUP BY token
        ORDER BY score DESC, df_fb DESC, token
        LIMIT 8
    """
    o["hash_split_assign"] = """
        SELECT doc_id,
               CASE WHEN ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4))::BIGINT % 100 < 80 THEN 'train'
                    WHEN ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4))::BIGINT % 100 < 90 THEN 'validation'
                    ELSE 'test' END AS split
        FROM documents
    """
    o["stratified_sample_top3"] = """
        WITH r AS (
          SELECT doc_id, source,
                 CAST(row_number() OVER (
                   PARTITION BY source
                   ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS INT) AS rk
          FROM documents
        )
        SELECT doc_id, source, rk FROM r WHERE rk <= 3
    """
    o["pack_sequences_greedy"] = """
        WITH RECURSIVE t AS (
          SELECT source AS shard, doc_id,
                 CASE WHEN length(trim(text)) = 0 THEN 0
                      ELSE len(regexp_split_to_array(trim(text), '\\s+')) END AS n_tokens,
                 row_number() OVER (PARTITION BY source ORDER BY doc_id) AS rn
          FROM documents
        ),
        r AS (
          SELECT shard, doc_id, n_tokens, rn, n_tokens AS acc, 0 AS seq
          FROM t WHERE rn = 1
          UNION ALL
          SELECT t.shard, t.doc_id, t.n_tokens, t.rn,
                 CASE WHEN r.acc + t.n_tokens > 256 THEN t.n_tokens
                      ELSE r.acc + t.n_tokens END,
                 CASE WHEN r.acc + t.n_tokens > 256 THEN r.seq + 1 ELSE r.seq END
          FROM r JOIN t ON t.shard = r.shard AND t.rn = r.rn + 1
        )
        SELECT shard, doc_id, CAST(n_tokens AS INT) AS n_tokens,
               CAST(seq AS INT) AS seq_id,
               CAST(acc - n_tokens AS INT) AS seq_offset
        FROM r
    """
    o["asof_join_purchase_click"] = """
        WITH p AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'),
        c AS (
          SELECT user_id, ts, max(event_id) AS click_id
          FROM events WHERE event_type = 'click' GROUP BY user_id, ts
        )
        SELECT p.event_id, p.user_id, coalesce(c.click_id, -1) AS click_id
        FROM p ASOF LEFT JOIN c ON p.user_id = c.user_id AND p.ts >= c.ts
    """
    o["range_join_purchase_clicks"] = """
        SELECT p.event_id, p.user_id,
               CAST(count(c.event_id) AS BIGINT) AS n_clicks_1h
        FROM events p
        LEFT JOIN events c
          ON c.user_id = p.user_id AND c.event_type = 'click'
         AND c.ts > p.ts AND c.ts <= p.ts + INTERVAL 1 HOUR
        WHERE p.event_type = 'purchase'
        GROUP BY p.event_id, p.user_id
    """
    o["lineage_rollup"] = """
        SELECT source, lang, count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS sum_chars
        FROM documents GROUP BY ROLLUP (source, lang)
    """
    o["lineage_cube"] = """
        SELECT source, lang, count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS sum_chars
        FROM documents GROUP BY CUBE (source, lang)
    """
    o["setops_active_custkeys"] = """
        SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1995
        INTERSECT
        SELECT o_custkey FROM orders WHERE year(o_orderdate) = 2000
        EXCEPT
        SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
    """
    o["ivf_all_probe_equals_exact"] = """
        WITH q AS (SELECT embedding e FROM embeddings WHERE vec_id = 0),
        scored AS (
          SELECT vec_id,
                 CAST(round(10000 * list_dot_product(embedding::DOUBLE[], (SELECT e FROM q)::DOUBLE[])
                   / (sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]))
                      * sqrt(list_dot_product((SELECT e FROM q)::DOUBLE[], (SELECT e FROM q)::DOUBLE[])))) AS BIGINT) AS score_i
          FROM embeddings
        )
        SELECT vec_id, score_i FROM scored ORDER BY score_i DESC, vec_id LIMIT 10
    """
    o["knn_graph_search"] = """
        WITH q AS (SELECT embedding e FROM embeddings WHERE vec_id = 0),
        scored AS (
          SELECT vec_id,
                 CAST(round(10000 * list_dot_product(embedding::DOUBLE[], (SELECT e FROM q)::DOUBLE[])
                   / (sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]))
                      * sqrt(list_dot_product((SELECT e FROM q)::DOUBLE[], (SELECT e FROM q)::DOUBLE[])))) AS BIGINT) AS score_i
          FROM embeddings
        )
        SELECT vec_id, score_i, CAST(1 AS BIGINT) AS found_i
        FROM scored ORDER BY score_i DESC, vec_id LIMIT 10
    """
    o["knn_graph_lsh_tier_search"] = """
        WITH q AS (SELECT embedding e FROM embeddings WHERE vec_id = 0),
        scored AS (
          SELECT vec_id,
                 CAST(round(10000 * list_dot_product(embedding::DOUBLE[], (SELECT e FROM q)::DOUBLE[])
                   / (sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]))
                      * sqrt(list_dot_product((SELECT e FROM q)::DOUBLE[], (SELECT e FROM q)::DOUBLE[])))) AS BIGINT) AS score_i
          FROM embeddings
        )
        SELECT vec_id, score_i, CAST(1 AS BIGINT) AS found_i
        FROM scored ORDER BY score_i DESC, vec_id LIMIT 10
    """
    o["knn_graph_incremental_insert"] = """
        WITH e AS (
          SELECT vec_id,
                 embedding::DOUBLE[] AS v,
                 sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]))
                   AS nrm
          FROM embeddings
        ),
        pairs AS (
          SELECT a.vec_id AS src, b.vec_id AS dst,
                 CAST(round(10000 * list_dot_product(a.v, b.v)
                      / (a.nrm * b.nrm)) AS BIGINT) AS sim_i
          FROM e a JOIN e b ON a.vec_id <> b.vec_id
        ),
        rk AS (SELECT src, dst, sim_i,
                      row_number() OVER (PARTITION BY src
                                         ORDER BY sim_i DESC, dst) AS _rk
               FROM pairs)
        SELECT src, dst, sim_i FROM rk WHERE _rk <= 6
        ORDER BY src, sim_i DESC, dst
    """
    o["knn_graph_delete_repair"] = """
        WITH e AS (
          SELECT vec_id,
                 embedding::DOUBLE[] AS v,
                 sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]))
                   AS nrm
          FROM embeddings WHERE vec_id % 7 <> 0
        ),
        pairs AS (
          SELECT a.vec_id AS src, b.vec_id AS dst,
                 CAST(round(10000 * list_dot_product(a.v, b.v)
                      / (a.nrm * b.nrm)) AS BIGINT) AS sim_i
          FROM e a JOIN e b ON a.vec_id <> b.vec_id
        ),
        rk AS (SELECT src, dst, sim_i,
                      row_number() OVER (PARTITION BY src
                                         ORDER BY sim_i DESC, dst) AS _rk
               FROM pairs)
        SELECT src, dst, sim_i FROM rk WHERE _rk <= 6
        ORDER BY src, sim_i DESC, dst
    """
    o["minhash_pairs_md5"] = _minhash_sql()
    o["minhash_groups_md5"] = _minhash_groups_sql()
    o["e3_triples_inline_svo"] = _e3_sql()
    o["cc_label_propagation"] = """
        WITH RECURSIVE base AS (
          SELECT DISTINCT user_id AS a, user_id - (user_id % 10) AS b FROM events
          UNION
          SELECT DISTINCT user_id, user_id + 1 FROM events WHERE user_id % 40 = 9
        ),
        edges AS (SELECT a AS u, b AS v FROM base UNION SELECT b, a FROM base),
        nodes AS (SELECT DISTINCT u AS node FROM edges),
        reach(node, root) AS (
          SELECT node, node FROM nodes
          UNION
          SELECT e.v, r.root FROM reach r JOIN edges e ON e.u = r.node
        )
        SELECT node, min(root) AS component FROM reach GROUP BY node
    """
    o["cc_incremental_merge"] = """
        WITH RECURSIVE base AS (
          SELECT DISTINCT user_id AS a, user_id - (user_id % 10) AS b FROM events
          UNION
          SELECT DISTINCT user_id, user_id + 1 FROM events WHERE user_id % 40 = 9
          UNION
          SELECT DISTINCT user_id, user_id + 13 FROM events WHERE user_id % 25 = 7
        ),
        edges AS (SELECT a AS u, b AS v FROM base UNION SELECT b, a FROM base),
        nodes AS (SELECT DISTINCT u AS node FROM edges),
        reach(node, root) AS (
          SELECT node, node FROM nodes
          UNION
          SELECT e.v, r.root FROM reach r JOIN edges e ON e.u = r.node
        )
        SELECT node, min(root) AS component FROM reach GROUP BY node
    """
    o["simhash_fingerprint"] = _simhash_sql("doc_id < 500")
    o["simhash_near_dup_pairs"] = f"""
        WITH d0 AS (SELECT doc_id, text FROM documents WHERE doc_id < 200),
        alld AS (
          SELECT doc_id, text FROM d0
          UNION ALL
          SELECT doc_id + 10000, text || ' tail' FROM d0
        ),
        t AS (
          SELECT doc_id,
                 list_transform(list_distinct(regexp_split_to_array(trim(text), '\\s+')),
                                w -> ('0x' || substr(md5(w), 1, 15))::BIGINT) AS hs
          FROM alld
        ),
        s AS (SELECT doc_id, CAST({_simhash_terms()} AS BIGINT) AS simhash FROM t)
        SELECT a.doc_id AS a, b.doc_id AS b,
               CAST(bit_count(xor(a.simhash, b.simhash)) AS INT) AS hamming
        FROM s a JOIN s b ON a.doc_id < b.doc_id
        WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
    """
    o["events_sessions_detail"] = """
        WITH g AS (
          -- floor() to whole seconds FIRST: Spark's unix_timestamp truncates,
          -- so the gap test and session bounds must work on floored epochs
          -- (CAST(double AS BIGINT) in DuckDB would ROUND instead)
          SELECT user_id, event_id, ts, floor(epoch(ts)) AS ep,
                 CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                        OR floor(epoch(ts)) - floor(epoch(lag(ts) OVER (
                             PARTITION BY user_id ORDER BY ts, event_id))) > 3600
                      THEN 1 ELSE 0 END AS new_session
          FROM events
        ),
        m AS (
          SELECT user_id, ts, ep,
                 CAST(sum(new_session) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id) AS INT) AS session_no
          FROM g
        )
        SELECT user_id, session_no,
               CAST(min(ep) AS BIGINT) AS session_start,
               CAST(max(ep) AS BIGINT) AS session_end,
               count(*) AS n_events
        FROM m GROUP BY user_id, session_no
    """
    o["multimodal_features"] = _multimodal_sql()
    o["image_dhash_near_dup"] = """
        WITH im AS (SELECT doc_id AS i, doc_id // 4 AS g, doc_id % 4 AS v
                    FROM documents),
        bits AS (
          SELECT i, r.r * 8 + c.c AS pos,
                 CASE WHEN
                   (CASE WHEN v = 3 AND r.r = 0 AND c.c = 0 THEN 255
                         ELSE (g*131 + r.r*37 + c.c*61) % 251 END)
                   < ((g*131 + r.r*37 + (c.c+1)*61) % 251)
                 THEN 1 ELSE 0 END AS b
          FROM im, range(8) r(r), range(8) c(c)
        ),
        ham AS (
          SELECT a.i AS ia, b.i AS ib,
                 CAST(sum(CASE WHEN a.b <> b.b THEN 1 ELSE 0 END) AS INT)
                   AS hamming
          FROM bits a JOIN bits b
            ON a.pos = b.pos AND 'img' || a.i < 'img' || b.i
          GROUP BY a.i, b.i
        )
        SELECT 'img' || ia AS id_a, 'img' || ib AS id_b, hamming
        FROM ham WHERE hamming <= 3
    """
    o["kg_triples_synthetic"] = _kg_e2e_sql()
    o["kg_session_provenance"] = f"""
        WITH t AS ({_kg_e2e_sql()}),
        counts AS (SELECT url, CAST(count(*) AS BIGINT) AS n_triples FROM t GROUP BY url),
        d AS (
          SELECT url,
                 regexp_extract(url, 'https?://([^/]+)', 1) AS host,
                 CAST(floor(epoch(warc_ts))
                      + (CAST(regexp_extract(url, 'p/(\\d+)$', 1) AS INT) % 7) * 600
                   AS BIGINT) AS ep
          FROM read_parquet('{_ensure_simple_corpus()}')
        ),
        g AS (
          SELECT *, CASE WHEN lag(ep) OVER w IS NULL OR ep - lag(ep) OVER w > 4000
                         THEN 1 ELSE 0 END AS ns
          FROM d WINDOW w AS (PARTITION BY host ORDER BY ep, url)
        ),
        m AS (
          SELECT *, sum(ns) OVER (PARTITION BY host ORDER BY ep, url) AS sno FROM g
        ),
        s AS (
          SELECT url, host,
                 host || '@' || CAST(CAST(min(ep) OVER (PARTITION BY host, sno) AS BIGINT) AS VARCHAR) AS session_id
          FROM m
        )
        SELECT s.url, s.host, s.session_id, coalesce(c.n_triples, 0) AS n_triples
        FROM s LEFT JOIN counts c ON c.url = s.url
    """
    o["tpch_q1_pricing_summary"] = """
        SELECT l_returnflag, l_linestatus,
               CAST(sum(l_quantity) AS BIGINT) AS sum_qty,
               CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS sum_base_price_ci,
               CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) AS BIGINT) AS sum_disc_price_ci,
               CAST(round(avg(l_quantity) * 100) AS BIGINT) AS avg_qty_i,
               count(*) AS count_order
        FROM lineitem WHERE l_shipdate <= '1998-09-02'
        GROUP BY l_returnflag, l_linestatus
    """
    o["tpch_q3_top_revenue"] = """
        SELECT o_orderkey,
               CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) AS BIGINT) AS revenue_ci
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        WHERE c_mktsegment = 'BUILDING'
        GROUP BY o_orderkey
        ORDER BY revenue_ci DESC, o_orderkey LIMIT 10
    """
    o["broadcast_chain_region_suppliers"] = """
        SELECT r_name, count(*) AS n_suppliers
        FROM supplier
        JOIN nation ON s_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        GROUP BY r_name
    """
    o["udaf_geomean_chars"] = """
        SELECT source,
               CAST(round(10000 * exp(avg(ln(n_chars)))) AS BIGINT) AS gmean_chars_i
        FROM documents WHERE n_chars > 0 GROUP BY source
    """
    o["udtf_sentence_explode"] = """
        WITH src AS (
          SELECT doc_id, text || '. Alpha beta! Gamma delta? The end.' AS t
          FROM documents WHERE doc_id < 200
        ),
        marked AS (
          SELECT doc_id, regexp_replace(t, '([.!?])(\\s+)', '\\1' || chr(30), 'g') AS m
          FROM src
        ),
        sents AS (
          SELECT doc_id, s, ord FROM (
            SELECT doc_id, unnest(string_split(m, chr(30))) AS s,
                   generate_subscripts(string_split(m, chr(30)), 1) AS ord
            FROM marked
          ) WHERE s <> ''
        )
        SELECT doc_id,
               CAST(row_number() OVER (PARTITION BY doc_id ORDER BY ord) - 1 AS INT) AS sent_no,
               s AS sentence
        FROM sents
    """
    o["global_sort_rank"] = """
        SELECT doc_id,
               CAST(row_number() OVER (ORDER BY lang, n_chars DESC, doc_id) AS INT) AS rank
        FROM documents
    """
    o["dedup_apply_keepers"] = _minhash_keepers_sql()
    o["clean_corpus_filter_chain"] = f"""
        WITH qf AS ({o["quality_features"]}),
             lg AS ({o["lang_id_heuristic"]}),
             kp AS (
               SELECT doc_id, min(doc_id) OVER (PARTITION BY md5(text)) AS keep_id
               FROM documents
             )
        SELECT qf.doc_id, qf.quality_i
        FROM qf
        JOIN lg ON lg.doc_id = qf.doc_id
        JOIN kp ON kp.doc_id = qf.doc_id
        WHERE lg.lang_detected = 'en' AND qf.quality_i >= 3000
          AND kp.keep_id = qf.doc_id
    """
    o["training_mix_pipeline"] = f"""
        WITH RECURSIVE
        qf AS (SELECT doc_id, quality_i FROM ({o["quality_features"]})),
        lg AS ({o["lang_id_heuristic"]}),
        kp AS (
          SELECT doc_id, min(doc_id) OVER (PARTITION BY md5(text)) AS keep_id
          FROM documents
        ),
        s1 AS (
          SELECT d.doc_id, d.source, d.text, qf.quality_i
          FROM documents d
          JOIN qf USING (doc_id) JOIN lg USING (doc_id) JOIN kp USING (doc_id)
          WHERE lg.lang_detected = 'en' AND qf.quality_i >= 3000
            AND kp.keep_id = d.doc_id
        ),
        btoks AS (
          SELECT list_filter(regexp_split_to_array(lower(trim(text)), '\\s+'),
                             t -> t <> '') AS arr
          FROM documents WHERE doc_id % 50 = 0
        ),
        bgrams AS (
          SELECT DISTINCT array_to_string(arr[i : i + 12], ' ') AS gram
          FROM btoks,
               LATERAL (SELECT unnest(generate_series(1, len(arr) - 12)) AS i) g
          WHERE len(arr) >= 13
        ),
        stoks AS (
          SELECT doc_id,
                 list_filter(regexp_split_to_array(lower(trim(text)), '\\s+'),
                             t -> t <> '') AS arr
          FROM s1
        ),
        sgrams AS (
          SELECT doc_id, array_to_string(arr[i : i + 12], ' ') AS gram
          FROM stoks,
               LATERAL (SELECT unnest(generate_series(1, len(arr) - 12)) AS i) g
          WHERE len(arr) >= 13
        ),
        dirty AS (SELECT DISTINCT s.doc_id FROM sgrams s JOIN bgrams b USING (gram)),
        s2 AS (SELECT * FROM s1
               WHERE doc_id NOT IN (SELECT doc_id FROM dirty)),
        c AS (SELECT source, count(*) AS n_s FROM s2 GROUP BY source),
        m AS (SELECT max(n_s) AS n_max FROM c),
        r AS (
          SELECT source,
                 CAST(least(1000000.0,
                      round(pow(CAST(n_max AS DOUBLE) / n_s, 0.5)
                            * 0.5 * 1000000.0)) AS BIGINT) AS rate_i
          FROM c, m),
        s3 AS (
          SELECT s2.*, r.rate_i FROM s2 JOIN r USING (source)
          WHERE ('0x' || substr(md5(CAST(s2.doc_id AS VARCHAR)), 1, 15))::BIGINT
                % 1000000 < r.rate_i
        ),
        t AS (
          SELECT source AS shard, doc_id, source, quality_i, rate_i,
                 CASE WHEN length(trim(text)) = 0 THEN 0
                      ELSE len(regexp_split_to_array(trim(text), '\\s+')) END
                   AS n_tokens,
                 row_number() OVER (PARTITION BY source ORDER BY doc_id) AS rn
          FROM s3
        ),
        packed AS (
          SELECT shard, doc_id, n_tokens, rn, n_tokens AS acc, 0 AS seq
          FROM t WHERE rn = 1
          UNION ALL
          SELECT t.shard, t.doc_id, t.n_tokens, t.rn,
                 CASE WHEN packed.acc + t.n_tokens > 256 THEN t.n_tokens
                      ELSE packed.acc + t.n_tokens END,
                 CASE WHEN packed.acc + t.n_tokens > 256 THEN packed.seq + 1
                      ELSE packed.seq END
          FROM packed JOIN t ON t.shard = packed.shard AND t.rn = packed.rn + 1
        )
        SELECT t.doc_id, t.source, t.quality_i, t.rate_i,
               CAST(t.n_tokens AS INT) AS n_tokens,
               CAST(p.seq AS INT) AS seq_id,
               CAST(p.acc - p.n_tokens AS INT) AS seq_offset
        FROM packed p JOIN t ON t.doc_id = p.doc_id
    """
    o["chars_percentiles"] = """
        SELECT lang,
               CAST(round(10000 * quantile_cont(n_chars, 0.5)) AS BIGINT) AS p50_i,
               CAST(round(10000 * quantile_cont(n_chars, 0.9)) AS BIGINT) AS p90_i
        FROM documents GROUP BY lang
    """
    o["chars_percentiles_approx"] = """
        SELECT lang,
               CAST(quantile_disc(n_chars, 0.5) AS BIGINT) AS p50_disc,
               CAST(quantile_disc(n_chars, 0.9) AS BIGINT) AS p90_disc
        FROM documents GROUP BY lang
    """
    o["order_date_math"] = """
        SELECT o_orderkey,
               strftime(date_trunc('month', o_orderdate::DATE), '%Y-%m-%d') AS month_start,
               strftime(o_orderdate::DATE + 30, '%Y-%m-%d') AS due_date,
               CAST(dayofweek(o_orderdate::DATE) + 1 AS INT) AS dow,
               strftime(last_day(o_orderdate::DATE), '%Y-%m-%d') AS month_end,
               CAST(date_diff('day', o_orderdate::DATE, last_day(o_orderdate::DATE)) AS INT) AS days_left
        FROM orders
    """
    o["events_sessionize"] = """
        WITH g AS (
          SELECT user_id,
                 CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                        OR epoch(ts) - epoch(lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)) > 3600
                      THEN 1 ELSE 0 END AS new_session
          FROM events
        )
        SELECT user_id, CAST(sum(new_session) AS BIGINT) AS n_sessions, count(*) AS n_events
        FROM g GROUP BY user_id
    """
    # shared entity-entity undirected edge CTE for the graph-analytics twins
    # (same predicate subset as kg_triangles)
    _gq_edges = f"""
        t AS ({_kg_e2e_sql()}),
        ee AS (SELECT DISTINCT least(subj, obj) AS a, greatest(subj, obj) AS b
               FROM t WHERE subj <> obj
                 AND pred IN ('acquired', 'owns', 'partnered_with')),
        nbrs AS (SELECT a AS node, b AS nbr FROM ee UNION ALL SELECT b, a FROM ee)
    """
    o["kg_link_prediction"] = f"""
        WITH {_gq_edges},
        deg AS (SELECT node, CAST(count(*) AS BIGINT) AS deg FROM nbrs GROUP BY node),
        zn AS (SELECT n.node AS z, n.nbr AS u, d.deg
               FROM nbrs n JOIN deg d ON d.node = n.node),
        wedges AS (SELECT l.u AS a, r.u AS b, l.deg AS zdeg
                   FROM zn l JOIN zn r ON r.z = l.z AND l.u < r.u),
        scored AS (SELECT a, b, CAST(count(*) AS BIGINT) AS n_common,
                          CAST(sum(1000000 // zdeg) AS BIGINT) AS ra_score_i
                   FROM wedges GROUP BY a, b)
        SELECT s.a, s.b, s.n_common, s.ra_score_i FROM scored s
        WHERE NOT EXISTS (SELECT 1 FROM ee WHERE ee.a = s.a AND ee.b = s.b)
    """
    _lpa_round = """
        {out} AS (
          SELECT node, label FROM (
            SELECT n.node, l.label, count(*) AS cnt,
                   row_number() OVER (PARTITION BY n.node
                                      ORDER BY count(*) DESC, l.label) AS rk
            FROM nbrs n JOIN {prev} l ON l.node = n.nbr
            GROUP BY n.node, l.label
          ) WHERE rk = 1)
    """
    o["kg_lpa_communities"] = (
        f"WITH {_gq_edges}, l0 AS (SELECT DISTINCT node, node AS label FROM nbrs),"
        + ",".join(
            _lpa_round.format(out=f"l{i}", prev=f"l{i - 1}") for i in (1, 2, 3)
        )
        + "SELECT node, label FROM l3"
    )
    o["kg_community_conductance"] = (
        f"WITH {_gq_edges}, l0 AS (SELECT DISTINCT node, node AS label FROM nbrs),"
        + ",".join(
            _lpa_round.format(out=f"l{i}", prev=f"l{i - 1}") for i in (1, 2, 3)
        )
        + """,
        labels AS (SELECT node, label FROM l3),
        tagged AS (
          SELECT ee.a, ee.b, la.label AS lab_a, lb.label AS lab_b
          FROM ee JOIN labels la ON la.node = ee.a
                  JOIN labels lb ON lb.node = ee.b
        ),
        internal AS (
          SELECT lab_a AS label, CAST(COUNT(*) AS BIGINT) AS internal_edges
          FROM tagged WHERE lab_a = lab_b GROUP BY 1
        ),
        cutu AS (
          SELECT lab_a AS label FROM tagged WHERE lab_a <> lab_b
          UNION ALL
          SELECT lab_b FROM tagged WHERE lab_a <> lab_b
        ),
        cut AS (SELECT label, CAST(COUNT(*) AS BIGINT) AS cut_edges
                FROM cutu GROUP BY 1),
        deg AS (SELECT node, CAST(COUNT(*) AS BIGINT) AS d FROM nbrs GROUP BY 1),
        vol AS (
          SELECT l.label, CAST(COUNT(*) AS BIGINT) AS n_nodes,
                 CAST(coalesce(SUM(d.d), 0) AS BIGINT) AS vol
          FROM labels l LEFT JOIN deg d USING (node) GROUP BY 1
        ),
        m2 AS (SELECT CAST(COUNT(*) * 2 AS BIGINT) AS m2 FROM ee)
        SELECT v.label, v.n_nodes, v.vol,
               CAST(coalesce(i.internal_edges, 0) AS BIGINT) AS internal_edges,
               CAST(coalesce(c.cut_edges, 0) AS BIGINT) AS cut_edges,
               CAST(CASE WHEN least(v.vol, m2.m2 - v.vol) > 0
                    THEN (coalesce(c.cut_edges, 0) * 1000000)
                         // least(v.vol, m2.m2 - v.vol)
                    ELSE -1 END AS BIGINT) AS conductance_mi
        FROM vol v LEFT JOIN internal i USING (label)
                   LEFT JOIN cut c USING (label), m2
    """
    )
    o["fim_transform_psm"] = """
        WITH toks AS (
          SELECT doc_id, s.tok AS tok, CAST(s.i - 1 AS BIGINT) AS i
          FROM (
            SELECT doc_id,
                   unnest(list_transform(
                     list_filter(regexp_split_to_array(trim(text), '\\s+'),
                                 x -> x <> ''),
                     (x, j) -> struct_pack(tok := x, i := j))) AS s
            FROM documents)
        ),
        nn AS (
          SELECT d.doc_id, CAST(coalesce(t.n, 0) AS BIGINT) AS n
          FROM documents d LEFT JOIN (
            SELECT doc_id, COUNT(*) AS n FROM toks GROUP BY 1) t USING (doc_id)
        ),
        cuts AS (
          SELECT doc_id, n,
            least(('0x' || substr(md5(doc_id || ':fim:a'), 1, 8))::BIGINT % (n + 1),
                  ('0x' || substr(md5(doc_id || ':fim:b'), 1, 8))::BIGINT % (n + 1))
              AS lo,
            greatest(('0x' || substr(md5(doc_id || ':fim:a'), 1, 8))::BIGINT % (n + 1),
                     ('0x' || substr(md5(doc_id || ':fim:b'), 1, 8))::BIGINT % (n + 1))
              AS hi,
            (('0x' || substr(md5(doc_id || ':fim:g'), 1, 4))::BIGINT % 100) < 50
              AS is_fim
          FROM nn
        ),
        seg AS (
          SELECT t.doc_id,
            string_agg(tok, ' ' ORDER BY i) FILTER (WHERE i < c.lo) AS pfx,
            string_agg(tok, ' ' ORDER BY i) FILTER (WHERE i >= c.lo AND i < c.hi)
              AS mid,
            string_agg(tok, ' ' ORDER BY i) FILTER (WHERE i >= c.hi) AS sfx,
            string_agg(tok, ' ' ORDER BY i) AS full_text
          FROM toks t JOIN cuts c USING (doc_id)
          GROUP BY t.doc_id, c.lo, c.hi
        )
        SELECT c.doc_id,
          CASE WHEN c.is_fim THEN 'fim' ELSE 'plain' END AS mode,
          CASE WHEN c.is_fim THEN coalesce(s.pfx, '')
               ELSE coalesce(s.full_text, '') END AS prefix,
          CASE WHEN c.is_fim THEN coalesce(s.mid, '') ELSE '' END AS middle,
          CASE WHEN c.is_fim THEN coalesce(s.sfx, '') ELSE '' END AS suffix,
          CAST(CASE WHEN c.is_fim THEN c.lo ELSE c.n END AS BIGINT) AS n_prefix,
          CAST(CASE WHEN c.is_fim THEN c.hi - c.lo ELSE 0 END AS BIGINT) AS n_middle,
          CAST(CASE WHEN c.is_fim THEN c.n - c.hi ELSE 0 END AS BIGINT) AS n_suffix
        FROM cuts c LEFT JOIN seg s USING (doc_id)
    """
    o["kg_inverse_predicates"] = """
        WITH base AS (
          SELECT 'E' || (doc_id % 20) AS s, 'E' || ((doc_id + 7) % 20) AS o,
                 'E' || ((doc_id + 3) % 20) AS o3, doc_id % 20 AS r
          FROM documents
        ),
        t AS (
          SELECT s AS subj, 'acquired' AS pred, o AS obj FROM base
          UNION ALL
          SELECT o, 'acquired_by', s FROM base WHERE r < 15
          UNION ALL
          SELECT s, 'acquired_by', o3 FROM base WHERE r >= 15
          UNION ALL
          SELECT s, 'partnered_with', o FROM base
          UNION ALL
          SELECT o, 'partnered_with', s FROM base
          UNION ALL
          SELECT s, 'owns', 'F' || r FROM base
        ),
        pairs AS (SELECT DISTINCT subj, pred, obj FROM t),
        sizes AS (SELECT pred, CAST(COUNT(*) AS BIGINT) AS n FROM pairs GROUP BY 1),
        common AS (
          SELECT a.pred AS pred_a, b.pred AS pred_b,
                 CAST(COUNT(*) AS BIGINT) AS n_common
          FROM pairs a JOIN pairs b
            ON a.subj = b.obj AND a.obj = b.subj AND a.pred <= b.pred
          GROUP BY 1, 2 HAVING COUNT(*) >= 2
        )
        SELECT c.pred_a, c.pred_b, c.n_common, sa.n AS n_a, sb.n AS n_b,
               CAST((c.n_common * 10000) // least(sa.n, sb.n) AS BIGINT)
                 AS inv_score_i
        FROM common c
          JOIN sizes sa ON sa.pred = c.pred_a
          JOIN sizes sb ON sb.pred = c.pred_b
    """
    o["preference_pairs_crawl"] = """
        WITH snaps AS (
          SELECT 'https://ex.org/p' || (doc_id % 50) AS url,
                 CAST(1700000000 + (doc_id // 50) * 86400 AS BIGINT) AS ts,
                 'page v' || (doc_id // 50) || ' ' ||
                   rtrim(repeat('body ',
                     CAST(((doc_id % 50) + (doc_id // 50) * 3) % 11 AS INT)))
                   AS text
          FROM documents
        ),
        scored AS (
          SELECT url, ts, text,
                 CAST(len(regexp_split_to_array(trim(text), '\\s+')) AS BIGINT) AS q
          FROM snaps
        ),
        l AS (
          SELECT url, lag(ts) OVER w AS ts_old, ts AS ts_new,
                 lag(text) OVER w AS rejected, text AS chosen,
                 q - lag(q) OVER w AS gain
          FROM scored WINDOW w AS (PARTITION BY url ORDER BY ts)
        )
        SELECT url, CAST(ts_old AS BIGINT) AS ts_old, ts_new, rejected, chosen,
               CAST(gain AS BIGINT) AS gain
        FROM l WHERE gain >= 2
    """
    o["kg_clustering_coefficient"] = f"""
        WITH {_gq_edges},
        deg AS (SELECT node, CAST(count(*) AS BIGINT) AS deg
                FROM nbrs GROUP BY node),
        tri AS (SELECT e1.a AS a, e1.b AS b, e2.b AS c
                FROM ee e1
                JOIN ee e2 ON e2.a = e1.b
                JOIN ee e3 ON e3.a = e1.a AND e3.b = e2.b),
        tn AS (SELECT node, CAST(count(*) AS BIGINT) AS n_tri FROM (
                 SELECT a AS node FROM tri
                 UNION ALL SELECT b FROM tri
                 UNION ALL SELECT c FROM tri) GROUP BY node)
        SELECT d.node, d.deg,
               CAST(coalesce(tn.n_tri, 0) AS BIGINT) AS n_tri,
               CAST(CASE WHEN d.deg >= 2
                    THEN (2000000 * coalesce(tn.n_tri, 0))
                         // (d.deg * (d.deg - 1))
                    ELSE 0 END AS BIGINT) AS lcc_i
        FROM deg d LEFT JOIN tn ON tn.node = d.node
    """
    o["kg_modularity"] = (
        f"WITH {_gq_edges}, l0 AS (SELECT DISTINCT node, node AS label FROM nbrs),"
        + ",".join(
            _lpa_round.format(out=f"l{i}", prev=f"l{i - 1}") for i in (1, 2, 3)
        )
        + """
        , mm AS (SELECT CAST(count(*) AS BIGINT) AS m FROM ee),
        deg AS (SELECT node, CAST(count(*) AS BIGINT) AS deg
                FROM nbrs GROUP BY node),
        comm AS (SELECT l.label, CAST(count(*) AS BIGINT) AS n_nodes,
                        CAST(sum(d.deg) AS BIGINT) AS d_sum
                 FROM l3 l JOIN deg d ON d.node = l.node GROUP BY l.label),
        ein AS (SELECT la.label, CAST(count(*) AS BIGINT) AS e_in
                FROM ee
                JOIN l3 la ON la.node = ee.a
                JOIN l3 lb ON lb.node = ee.b AND lb.label = la.label
                GROUP BY la.label)
        SELECT c.label, c.n_nodes,
               CAST(coalesce(e.e_in, 0) AS BIGINT) AS e_in, c.d_sum,
               (SELECT m FROM mm) AS m,
               CAST(4 * (SELECT m FROM mm) * coalesce(e.e_in, 0)
                    - c.d_sum * c.d_sum AS BIGINT) AS q_num
        FROM comm c LEFT JOIN ein e ON e.label = c.label
    """
    )
    o["layout_template_census"] = f"""
        WITH lay AS (
          SELECT 0 AS v, ['html>body','body>div','div>p'] AS toks
          UNION ALL SELECT 1, ['html>body','body>table','table>tr','tr>td']
          UNION ALL SELECT 2, ['html>body','body>ul','ul>li','li>li']
        ),
        h AS (SELECT v, list_transform(list_distinct(toks),
                     w -> ('0x' || substr(md5(w), 1, 15))::BIGINT) AS hs
              FROM lay),
        fp AS (SELECT v, CAST({_simhash_terms()} AS BIGINT) AS layout_hash FROM h),
        d AS (SELECT doc_id % 3 AS v, 'L' || (doc_id % 4) AS host FROM documents)
        SELECT d.host, fp.layout_hash, CAST(count(*) AS BIGINT) AS n_pages
        FROM d JOIN fp USING (v) GROUP BY d.host, fp.layout_hash
    """
    o["length_outliers_mad"] = """
        WITH d AS (SELECT source AS g, doc_id, CAST(n_chars AS BIGINT) AS v
                   FROM documents),
        med AS (SELECT g, CAST(quantile_disc(v, 0.5) AS BIGINT) AS med
                FROM d GROUP BY g),
        j AS (SELECT d.g, d.doc_id, d.v, med.med, abs(d.v - med.med) AS adev
              FROM d JOIN med USING (g)),
        mad AS (SELECT g, CAST(quantile_disc(adev, 0.5) AS BIGINT) AS mad
                FROM j GROUP BY g)
        SELECT j.g AS source, j.doc_id, j.v AS value, j.med, mad.mad,
               CASE WHEN mad.mad > 0
                    THEN CAST((1000 * j.adev) // mad.mad AS BIGINT)
                    ELSE CAST(-1 AS BIGINT) END AS dev_pm
        FROM j JOIN mad USING (g)
        WHERE 1000 * j.adev > 2000 * mad.mad
    """
    o["fulltext_best_snippet"] = """
        WITH toks AS (SELECT doc_id AS id,
                             regexp_split_to_array(lower(trim(text)), '\\s+') AS t
                      FROM documents),
        hits AS (SELECT id,
                        unnest(list_filter(generate_series(1, len(t)),
                               i -> list_contains(['join','hash','scan'], t[i]))) AS p
                 FROM toks),
        scored AS (SELECT a.id, a.p AS start, CAST(count(*) AS BIGINT) AS n_hits
                   FROM hits a JOIN hits b
                     ON b.id = a.id AND b.p >= a.p AND b.p < a.p + 8
                   GROUP BY a.id, a.p),
        best AS (SELECT id, start, n_hits FROM (
                   SELECT *, row_number() OVER (PARTITION BY id
                             ORDER BY n_hits DESC, start) AS rk
                   FROM scored) WHERE rk = 1)
        SELECT b.id, CAST(b.start AS BIGINT) AS start, b.n_hits,
               array_to_string(t[b.start:b.start+7], ' ') AS snippet
        FROM best b JOIN toks ON toks.id = b.id
    """
    o["host_pagerank_drift"] = f"""
        SELECT coalesce(p0.node, p1.node) AS node,
               CAST(coalesce(p0.pr_i, 0) AS BIGINT) AS pr_a_i,
               CAST(coalesce(p1.pr_i, 0) AS BIGINT) AS pr_b_i,
               CAST(coalesce(p1.pr_i, 0) - coalesce(p0.pr_i, 0) AS BIGINT) AS drift_i
        FROM ({_pagerank_sql(edges_sql=_host_edges_sql("i % 2 = 0"))}) p0
        FULL OUTER JOIN ({_pagerank_sql(edges_sql=_host_edges_sql("i % 2 = 1"))}) p1
          ON p1.node = p0.node
    """
    o["wikitext_infobox_triples"] = """
        WITH p AS (SELECT doc_id AS i FROM documents WHERE doc_id < 120)
        SELECT 'Article ' || i AS subj, 'wiki:type' AS pred, 'company' AS obj FROM p
        UNION ALL
        SELECT 'Article ' || i, 'infobox:name',
               'Entity ' || (i % 40)
               || CASE WHEN i % 10 = 0 THEN ' & Co' ELSE '' END FROM p
        UNION ALL
        SELECT 'Article ' || i, 'infobox:founded',
               CAST(1980 + i % 35 AS VARCHAR) FROM p
        UNION ALL
        SELECT 'Article ' || i, 'infobox:hq', 'City' || (i % 9) FROM p
    """
    o["wiki_internal_links"] = """
        WITH p AS (SELECT doc_id AS i FROM documents WHERE doc_id < 120)
        SELECT 'Article ' || i AS src_title,
               'Article ' || ((i * 7 + 3) % 120) AS dst_title FROM p
        UNION ALL
        SELECT 'Article ' || i, 'Article ' || ((i * 7 + 4) % 120) FROM p
    """
    _dict_cte = f"""
        t AS ({_kg_e2e_sql()}),
        terms AS (
          SELECT term, CAST(max(ps) AS INTEGER) AS is_subj,
                 CAST(max(pp) AS INTEGER) AS is_pred,
                 CAST(max(po) AS INTEGER) AS is_obj
          FROM (
            SELECT subj AS term, 1 AS ps, 0 AS pp, 0 AS po FROM t
            UNION ALL SELECT pred, 0, 1, 0 FROM t
            UNION ALL SELECT obj, 0, 0, 1 FROM t
          ) GROUP BY term
        ),
        dict AS (SELECT term, CAST(row_number() OVER (ORDER BY term) - 1 AS BIGINT)
                        AS id, is_subj, is_pred, is_obj
                 FROM terms)
    """
    o["kg_term_dictionary"] = f"""
        WITH {_dict_cte}
        SELECT term, id, is_subj, is_pred, is_obj FROM dict
    """
    o["kg_encoded_triples"] = f"""
        WITH {_dict_cte}
        SELECT ds.id AS s_id, dp.id AS p_id, do_.id AS o_id
        FROM t JOIN dict ds ON ds.term = t.subj
               JOIN dict dp ON dp.term = t.pred
               JOIN dict do_ ON do_.term = t.obj
    """
    o["kg_assortativity"] = f"""
        WITH {_gq_edges},
        deg AS (SELECT node, CAST(count(*) AS BIGINT) AS deg
                FROM nbrs GROUP BY node),
        sym AS (SELECT a, b FROM ee UNION ALL SELECT b, a FROM ee),
        pts AS (SELECT da.deg AS x, db.deg AS y
                FROM sym JOIN deg da ON da.node = sym.a
                         JOIN deg db ON db.node = sym.b),
        s AS (SELECT CAST(count(*) AS BIGINT) AS n_points,
                     CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
                     CAST(sum(x * y) AS BIGINT) AS sxy,
                     CAST(sum(x * x) AS BIGINT) AS sxx,
                     CAST(sum(y * y) AS BIGINT) AS syy
              FROM pts)
        SELECT n_points, sx, sy, sxy, sxx, syy,
               CASE WHEN (n_points * sxx - sx * sx) > 0
                     AND (n_points * syy - sy * sy) > 0
                    THEN CAST(round(1000000 * (n_points * sxy - sx * sy)
                         / sqrt(CAST(n_points * sxx - sx * sx AS DOUBLE)
                                * CAST(n_points * syy - sy * sy AS DOUBLE)))
                         AS BIGINT)
                    ELSE CAST(-2000000 AS BIGINT) END AS r_i
        FROM s
    """
    o["kg_degree_profile"] = f"""
        WITH {_gq_edges},
        deg AS (SELECT node, CAST(count(*) AS BIGINT) AS deg
                FROM nbrs GROUP BY node)
        SELECT CAST(length(bin(deg)) - 1 AS BIGINT) AS bucket,
               CAST(count(*) AS BIGINT) AS n_nodes,
               CAST(min(deg) AS BIGINT) AS min_deg,
               CAST(max(deg) AS BIGINT) AS max_deg,
               CAST(sum(deg) AS BIGINT) AS sum_deg
        FROM deg GROUP BY 1
    """
    o["kg_bgp_aggregate"] = f"""
        WITH t AS ({_kg_e2e_sql()}),
        b AS (SELECT DISTINCT subj AS x, obj AS city FROM t WHERE pred = 'based_in'),
        a AS (SELECT DISTINCT subj AS y, obj AS x FROM t WHERE pred = 'acquired'),
        m AS (SELECT DISTINCT b.x, b.city, a.y FROM b JOIN a ON a.x = b.x)
        SELECT city, CAST(count(DISTINCT x) AS BIGINT) AS n_targets,
               CAST(count(DISTINCT y) AS BIGINT) AS n_acquirers
        FROM m GROUP BY city HAVING count(DISTINCT x) >= 2
    """
    o["mirror_host_pairs"] = """
        WITH rel AS (
          SELECT DISTINCT
                 md5('c' || (CASE WHEN doc_id % 6 = 5 THEN doc_id % 160
                                  ELSE doc_id % 80 END)) AS key,
                 'm' || (doc_id % 6) AS item
          FROM documents),
        small AS (SELECT key FROM rel GROUP BY key HAVING count(*) <= 1000),
        d AS (SELECT rel.key, rel.item FROM rel JOIN small USING (key)),
        deg AS (SELECT item, CAST(count(*) AS BIGINT) AS deg FROM d GROUP BY item),
        pairs AS (SELECT l.item AS a, r.item AS b,
                         CAST(count(*) AS BIGINT) AS n_common
                  FROM d l JOIN d r ON r.key = l.key AND l.item < r.item
                  GROUP BY l.item, r.item)
        SELECT p.a, p.b, p.n_common, da.deg AS deg_a, db.deg AS deg_b,
               CAST((1000000 * p.n_common) // (da.deg + db.deg - p.n_common)
                    AS BIGINT) AS jaccard_i
        FROM pairs p JOIN deg da ON da.item = p.a JOIN deg db ON db.item = p.b
        WHERE p.n_common >= 5
          AND (1000000 * p.n_common) // (da.deg + db.deg - p.n_common) >= 200000
    """
    o["kg_triple_extent"] = f"""
        WITH t AS ({_kg_e2e_sql()}),
        obs AS (SELECT subj, pred, obj, url,
                       CAST(regexp_extract(url, 'p/(\\d+)$', 1) AS BIGINT) * 311 AS ts
                FROM t)
        SELECT subj, pred, obj,
               CAST(min(ts) AS BIGINT) AS first_seen,
               CAST(max(ts) AS BIGINT) AS last_seen,
               CAST(count(*) AS BIGINT) AS n_observations,
               CAST(count(DISTINCT url) AS BIGINT) AS n_sources,
               CAST(max(ts) - min(ts) AS BIGINT) AS extent
        FROM obs GROUP BY subj, pred, obj
    """
    # anchor alias CTE (same closed form as anchor_alias_mining's oracle)
    _anchor_cte = f"""
        ids AS (
          SELECT CAST(regexp_extract(url, 'a/(\\d+)$', 1) AS BIGINT) AS i
          FROM read_parquet('{_ensure_link_corpus()}')),
        a AS (
          SELECT 'https://host' || (((i * 7 + 1) % 240) % 12) || '.example.org/a/'
                   || ((i * 7 + 1) % 240) AS dst_url,
                 'page ' || ((i * 7 + 1) % 240) AS anchor
          FROM ids
          UNION ALL
          SELECT 'https://host' || (i % 12) || '.example.org/a/'
                   || ((i * 13 + 5) % 240),
                 'local page ' || ((i * 13 + 5) % 240)
          FROM ids
          UNION ALL
          SELECT 'https://ext' || (i % 5) || '.example.net/x/' || (i % 3),
                 'external'
          FROM ids),
        aliases AS (SELECT dst_url, anchor, CAST(count(*) AS BIGINT) AS n_mentions
                    FROM a GROUP BY dst_url, anchor),
        tot AS (SELECT anchor, CAST(sum(n_mentions) AS BIGINT) AS n_total
                FROM aliases GROUP BY anchor),
        common AS (
          SELECT al.anchor, al.dst_url, al.n_mentions, tot.n_total,
                 CAST((1000000 * al.n_mentions) // tot.n_total AS BIGINT) AS prior_i
          FROM aliases al JOIN tot ON tot.anchor = al.anchor)
    """
    o["anchor_commonness_prior"] = f"""
        WITH {_anchor_cte}
        SELECT anchor, dst_url, n_mentions, n_total, prior_i FROM common
    """
    o["mention_disambiguation"] = f"""
        WITH {_anchor_cte}
        SELECT anchor, dst_url, n_mentions, n_total, prior_i FROM (
          SELECT *, row_number() OVER (PARTITION BY anchor
                                       ORDER BY n_mentions DESC, dst_url) AS rk
          FROM common
        ) WHERE rk = 1
    """
    # BPE training twin: n rounds unrolled; each round re-derives the best
    # pair from ITS OWN state (never reads the Spark choice) and merges via
    # the same greedy left-to-right fold (list_reduce over a chr(30)-joined
    # accumulator; chr(31) encodes the pair key for the shared tie-break)
    _bpe_rounds = 5
    _bpe_parts = [
        r"""
        wx AS (SELECT doc_id, unnest(list_filter(
                 regexp_split_to_array(
                   lower(regexp_replace(text, '[\x00-\x1f]', ' ', 'g')), '\s+'),
                 t -> t <> '')) AS w
               FROM documents),
        vocab AS (SELECT w, CAST(count(*) AS BIGINT) AS cnt FROM wx GROUP BY w),
        state0 AS (SELECT w, cnt,
                     list_transform(range(1, length(w) + 1),
                                    i -> substr(w, CAST(i AS INT), 1)) AS syms
                   FROM vocab)"""
    ]
    for _k in range(1, _bpe_rounds + 1):
        _bpe_parts.append(f"""
        pairs{_k} AS (
          SELECT pair, CAST(sum(cnt) AS BIGINT) AS n FROM (
            SELECT unnest(list_transform(range(1, len(syms)),
                     i -> syms[CAST(i AS INT)] || chr(31) || syms[CAST(i AS INT) + 1])) AS pair,
                   cnt
            FROM state{_k - 1})
          GROUP BY pair),
        best{_k} AS (
          SELECT string_split(pair, chr(31))[1] AS x,
                 string_split(pair, chr(31))[2] AS y,
                 string_split(pair, chr(31))[1] || string_split(pair, chr(31))[2] AS m,
                 n
          FROM pairs{_k} ORDER BY n DESC, pair LIMIT 1),
        state{_k} AS (
          SELECT w, cnt, string_split(list_reduce(syms, (acc, s) -> CASE
                   WHEN (acc = b.x OR ends_with(acc, chr(30) || b.x)) AND s = b.y
                   THEN substr(acc, 1, length(acc) - length(b.x)) || b.m
                   ELSE acc || chr(30) || s END), chr(30)) AS syms
          FROM state{_k - 1}, best{_k} b)""")
    o["bpe_train_merges"] = (
        "WITH "
        + ",".join(_bpe_parts)
        + "\nUNION ALL\n".join(
            f"SELECT CAST({_k} AS INT) AS step, x, y, m AS merged, n FROM best{_k}"
            for _k in range(1, _bpe_rounds + 1)
        )
    )
    o["bpe_encode_corpus"] = (
        "WITH "
        + ",".join(_bpe_parts)
        + f""",
        dw AS (SELECT doc_id, w, CAST(count(*) AS BIGINT) AS n_w
               FROM wx GROUP BY doc_id, w)
        SELECT dw.doc_id, t.token, CAST(sum(dw.n_w) AS BIGINT) AS n
        FROM dw
        JOIN (SELECT w, unnest(syms) AS token FROM state{_bpe_rounds}) t USING (w)
        GROUP BY dw.doc_id, t.token
    """
    )
    o["passage_windows_overlap"] = r"""
        WITH toks AS (
          SELECT doc_id,
                 list_filter(regexp_split_to_array(trim(text), '\s+'),
                             t -> t <> '') AS t
          FROM documents WHERE length(trim(text)) > 0),
        starts AS (
          SELECT doc_id, t,
                 unnest(range(1, greatest(len(t) - 16 + 1, 1) + 1, 12)) AS start
          FROM toks)
        SELECT doc_id,
               CAST((start - 1) // 12 + 1 AS INT) AS passage_no,
               CAST(start AS BIGINT) AS start_token,
               array_to_string(list_slice(t, start, start + 15), ' ') AS passage,
               CAST(least(16, len(t) - start + 1) AS BIGINT) AS n_tokens
        FROM starts
    """
    o["frontier_politeness_budget"] = """
        WITH frontier AS (
          SELECT 'https://h' || (doc_id % 7) || '.example.org/p/' || doc_id AS url,
                 'h' || (doc_id % 7) AS host,
                 CAST((doc_id * 37) % 101 AS BIGINT) AS priority_i
          FROM documents)
        SELECT url, host, priority_i, CAST(rk AS INT) AS fetch_rank FROM (
          SELECT *, row_number() OVER (PARTITION BY host
                     ORDER BY priority_i DESC, url) AS rk
          FROM frontier
        ) WHERE rk <= 3
    """
    o["kg_entity_cards"] = f"""
        WITH t AS ({_kg_e2e_sql()}),
        tt AS (SELECT *, CAST(regexp_extract(url, 'p/(\\d+)$', 1) AS BIGINT) * 311 AS ts
               FROM t),
        mentions AS (
          SELECT subj AS entity, url, ts, 1 AS as_subj, 0 AS as_obj FROM tt
          UNION ALL
          SELECT obj, url, ts, 0, 1 FROM tt
        ),
        stats AS (
          SELECT entity,
                 CAST(count(*) AS BIGINT) AS n_mentions,
                 CAST(sum(as_subj) AS BIGINT) AS n_as_subj,
                 CAST(sum(as_obj) AS BIGINT) AS n_as_obj,
                 CAST(count(DISTINCT url) AS BIGINT) AS n_pages,
                 CAST(min(ts) AS BIGINT) AS first_seen,
                 CAST(max(ts) AS BIGINT) AS last_seen
          FROM mentions GROUP BY entity),
        fl AS (
          SELECT entity, max(pl) AS is_place, max(pe) AS is_person_rel FROM (
            SELECT subj AS entity, FALSE AS pl, FALSE AS pe FROM t
            UNION ALL
            SELECT obj, pred IN ('based_in', 'located_in'),
                   pred IN ('founded_by', 'works_for') FROM t
          ) GROUP BY entity),
        types AS (
          SELECT entity,
            CASE WHEN is_place THEN 'place'
                 WHEN is_person_rel THEN 'person'
                 WHEN regexp_matches(entity,
                      '\\b(Corp|Corporation|Inc|Ltd|LLC|GmbH|Co|Company)$')
                   THEN 'org'
                 WHEN regexp_matches(entity, '^[A-Z][a-z]+ [A-Z][a-z]+$')
                   THEN 'person'
                 ELSE 'other' END AS etype
          FROM fl)
        SELECT s.*, types.etype FROM stats s JOIN types USING (entity)
    """
    _conflict_cte = """
        obs AS (
          SELECT 'E' || (doc_id % 40) AS subj,
                 'ceo' AS pred,
                 'P' || (CASE WHEN doc_id % 5 = 0 THEN (doc_id % 40) + 100
                              ELSE doc_id % 40 END) AS obj,
                 'h' || (doc_id % 11) AS host,
                 CAST((doc_id * 17) % 500 AS BIGINT) AS ts
          FROM documents)
    """
    o["kg_fact_resolution"] = f"""
        WITH {_conflict_cte},
        stats AS (SELECT subj, pred,
                         CAST(count(DISTINCT obj) AS BIGINT) AS n_distinct_obj,
                         CAST(count(*) AS BIGINT) AS n_observations
                  FROM obs GROUP BY subj, pred),
        latest AS (SELECT subj, pred, obj AS resolved_obj FROM (
          SELECT subj, pred, obj,
                 row_number() OVER (PARTITION BY subj, pred
                                    ORDER BY ts DESC, obj) AS rk
          FROM obs) WHERE rk = 1)
        SELECT s.subj, s.pred, l.resolved_obj, s.n_distinct_obj,
               s.n_observations,
               CAST(CASE WHEN s.n_distinct_obj > 1 THEN 1 ELSE 0 END AS BIGINT)
                 AS conflicted_i
        FROM stats s JOIN latest l USING (subj, pred)
    """
    o["kg_source_reliability"] = f"""
        WITH {_conflict_cte},
        votes AS (SELECT subj, pred, obj, count(*) AS n
                  FROM obs GROUP BY subj, pred, obj),
        majority AS (SELECT subj, pred, obj AS maj_obj FROM (
          SELECT subj, pred, obj,
                 row_number() OVER (PARTITION BY subj, pred
                                    ORDER BY n DESC, obj) AS rk
          FROM votes) WHERE rk = 1)
        SELECT o.host,
               CAST(count(*) AS BIGINT) AS n_assertions,
               CAST(sum(CASE WHEN o.obj = m.maj_obj THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_majority,
               CAST((1000000 * sum(CASE WHEN o.obj = m.maj_obj THEN 1 ELSE 0 END))
                 // count(*) AS BIGINT) AS reliability_i
        FROM obs o JOIN majority m USING (subj, pred)
        GROUP BY o.host
    """
    o["kg_fact_confidence"] = f"""
        WITH {_conflict_cte},
        votes_n AS (SELECT subj, pred, obj, count(*) AS n
                    FROM obs GROUP BY subj, pred, obj),
        majority AS (SELECT subj, pred, obj AS maj_obj FROM (
          SELECT subj, pred, obj,
                 row_number() OVER (PARTITION BY subj, pred
                                    ORDER BY n DESC, obj) AS rk
          FROM votes_n) WHERE rk = 1),
        rel AS (
          SELECT o.host,
                 CAST((1000000 * sum(CASE WHEN o.obj = m.maj_obj THEN 1 ELSE 0 END))
                   // count(*) AS BIGINT) AS reliability_i
          FROM obs o JOIN majority m USING (subj, pred)
          GROUP BY o.host),
        dv AS (SELECT DISTINCT host, subj, pred, obj FROM obs)
        SELECT dv.subj, dv.pred, dv.obj,
               CAST(count(*) AS BIGINT) AS n_hosts,
               CAST(sum(rel.reliability_i) AS BIGINT) AS support_i,
               CAST((1000 * sum(rel.reliability_i))
                 // (1000000 * count(*)) AS BIGINT) AS confidence_pm
        FROM dv JOIN rel USING (host)
        GROUP BY dv.subj, dv.pred, dv.obj
    """
    o["deepwalk_skipgram_pairs"] = f"""
        WITH w AS MATERIALIZED ({_walks_sql(4, _host_edges_sql())})
        SELECT l.node AS center, r.node AS context,
               CAST(count(*) AS BIGINT) AS n_pairs
        FROM w l JOIN w r
          ON l.start = r.start AND abs(l.step - r.step) BETWEEN 1 AND 2
        GROUP BY l.node, r.node
    """
    o["bigram_lm_scores"] = r"""
        WITH toks AS (
          SELECT doc_id,
                 list_filter(regexp_split_to_array(lower(trim(text)), '\s+'),
                             t -> t <> '') AS t
          FROM documents),
        big AS (
          SELECT doc_id,
                 unnest(CASE WHEN len(t) >= 2
                   THEN list_transform(range(1, len(t)),
                          i -> t[CAST(i AS INT)] || ' ' || t[CAST(i AS INT) + 1])
                   ELSE [] END) AS bigram
          FROM toks),
        counts AS (SELECT bigram, count(*) AS cab FROM big GROUP BY bigram),
        left_tot AS (
          SELECT string_split(bigram, ' ')[1] AS a, sum(cab) AS ca
          FROM counts GROUP BY 1),
        vs AS (SELECT count(DISTINCT tok) AS v FROM
               (SELECT unnest(t) AS tok FROM toks)),
        model AS (
          SELECT c.bigram,
                 CAST(round(1e6 * ln((c.cab + 1) / (lt.ca + vs.v))) AS BIGINT)
                   AS logp_i
          FROM counts c
          JOIN left_tot lt ON lt.a = string_split(c.bigram, ' ')[1], vs),
        scored AS (
          SELECT b.doc_id,
                 CAST(count(*) AS BIGINT) AS n_bigrams,
                 CAST(sum(m.logp_i) AS BIGINT) AS sum_logp_i
          FROM big b JOIN model m USING (bigram) GROUP BY b.doc_id)
        SELECT d.doc_id,
               coalesce(s.n_bigrams, 0) AS n_bigrams,
               coalesce(s.sum_logp_i, 0) AS sum_logp_i
        FROM documents d LEFT JOIN scored s USING (doc_id)
    """
    o["dedup_quality_keepers"] = (
        "WITH RECURSIVE "
        + _minhash_cte()
        + """,
        edges AS (SELECT a AS u, b AS v FROM pairs UNION SELECT b, a FROM pairs),
        enodes AS (SELECT DISTINCT u AS node FROM edges),
        reach(node, root) AS (
          SELECT node, node FROM enodes
          UNION
          SELECT e.v, r.root FROM reach r JOIN edges e ON e.u = r.node
        ),
        comp AS (SELECT node, min(root) AS grp FROM reach GROUP BY node),
        qbase AS (SELECT doc_id AS id, CAST(length(text) AS BIGINT) AS score_i FROM alld),
        withg AS (SELECT b.id, b.score_i, coalesce(c.grp, b.id) AS grp
                  FROM qbase b LEFT JOIN comp c ON c.node = b.id),
        keep AS (SELECT grp, id AS keep_id FROM (
          SELECT grp, id, row_number() OVER (PARTITION BY grp
                   ORDER BY score_i DESC NULLS LAST, id) AS rk FROM withg
        ) WHERE rk = 1)
        SELECT w.id, k.keep_id, w.score_i FROM withg w JOIN keep k ON k.grp = w.grp
    """
    )
    o["winnow_fingerprint_summary"] = (
        "WITH "
        + _winnow_sql(k=8, w=4)
        + """,
        keyed AS (SELECT doc_id,
                         lpad(CAST(fp AS VARCHAR), 19, '0') || ':' ||
                         lpad(CAST(pos AS VARCHAR), 6, '0') AS kk
                  FROM fps)
        SELECT doc_id, CAST(count(*) AS BIGINT) AS n_fp,
               md5(string_agg(kk, ',' ORDER BY kk)) AS fp_md5
        FROM keyed GROUP BY doc_id
    """
    )
    o["cms_heavy_hitters"] = """
        WITH toks AS (
          SELECT unnest(regexp_split_to_array(lower(text), '\\s+')) AS tok
          FROM documents
        ),
        cnts AS (SELECT tok, count(*) AS cnt FROM toks WHERE tok <> '' GROUP BY tok),
        fan AS (SELECT tok, cnt, unnest([0, 1, 2, 3]) AS r FROM cnts),
        counters AS (
          SELECT r,
                 ('0x' || substr(md5(CAST(r AS VARCHAR) || ':' || tok), 1, 8))::BIGINT % 256
                   AS bucket,
                 CAST(sum(cnt) AS BIGINT) AS c
          FROM fan GROUP BY 1, 2
        ),
        est AS (
          SELECT f.tok, min(k.c) AS est
          FROM fan f JOIN counters k
            ON k.r = f.r
           AND k.bucket = ('0x' || substr(md5(CAST(f.r AS VARCHAR) || ':' || f.tok), 1, 8))::BIGINT % 256
          GROUP BY f.tok
        )
        SELECT e.tok, CAST(e.est AS BIGINT) AS est_l,
               CAST(c.cnt AS BIGINT) AS true_l,
               CAST(e.est - c.cnt AS BIGINT) AS over_l
        FROM est e JOIN cnts c ON c.tok = e.tok
        ORDER BY est_l DESC, e.tok LIMIT 20
    """
    # shared by gazetteer_entity_tags and entity_salience (which composes it)
    gaz_rolled = f"""
        WITH gaz(surface, etype) AS (VALUES {_gazetteer_values_sql()}),
        g AS (SELECT surface, etype, len(string_split(surface, ' ')) AS nw FROM gaz),
        tk AS (SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\\s+') AS t
               FROM documents WHERE length(trim(text)) > 0),
        toks AS (SELECT doc_id,
                        unnest(list_transform(generate_series(1, len(t)),
                               i -> struct_pack(pos := i, tok := t[i]))) AS s
                 FROM tk),
        bigs AS (SELECT doc_id,
                        unnest(list_transform(generate_series(1, len(t) - 1),
                               i -> struct_pack(pos := i, bg := t[i] || ' ' || t[i + 1]))) AS s
                 FROM tk WHERE len(t) >= 2),
        big_hits AS (
          SELECT b.doc_id, CAST(b.s.pos AS INT) AS pos, g.surface, g.etype
          FROM bigs b JOIN g ON g.nw = 2 AND g.surface = b.s.bg),
        covered AS (
          SELECT DISTINCT doc_id, unnest([pos, pos + 1]) AS pos FROM big_hits),
        uni_hits AS (
          SELECT u.doc_id, CAST(u.s.pos AS INT) AS pos, g.surface, g.etype
          FROM toks u JOIN g ON g.nw = 1 AND g.surface = u.s.tok),
        kept_uni AS (
          SELECT u.* FROM uni_hits u
          WHERE NOT EXISTS (SELECT 1 FROM covered c
                            WHERE c.doc_id = u.doc_id AND c.pos = u.pos)),
        allm AS (SELECT * FROM big_hits UNION ALL SELECT * FROM kept_uni),
        rolled AS (
          SELECT doc_id, surface, etype,
                 CAST(count(*) AS BIGINT) AS n_hits,
                 CAST(min(pos) AS INT) AS first_pos
          FROM allm GROUP BY doc_id, surface, etype)
    """
    o["gazetteer_entity_tags"] = (
        gaz_rolled + "SELECT doc_id, surface, etype, n_hits, first_pos FROM rolled"
    )
    o["entity_salience"] = gaz_rolled + """
        , sal AS (
          SELECT *, CAST(n_hits * 1000000 // (first_pos + 9) AS BIGINT) AS salience_i
          FROM rolled)
        SELECT *, CAST(row_number() OVER (
                 PARTITION BY doc_id
                 ORDER BY salience_i DESC, surface) AS INT) AS rk
        FROM sal
    """
    o["extractive_summary_top2"] = f"""
        WITH tk AS (SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\\s+') AS t
                    FROM documents WHERE length(trim(text)) > 0),
        ch AS (SELECT doc_id,
                      unnest(list_transform(
                        generate_series(1, CAST(ceil(len(t) / 10.0) AS INT)),
                        i -> struct_pack(idx := i,
                                         words := t[(i - 1) * 10 + 1 : (i - 1) * 10 + 10]))) AS c
               FROM tk),
        chunks AS (SELECT doc_id, CAST(c.idx AS INT) AS chunk_idx, c.words AS words FROM ch),
        words AS (SELECT doc_id, chunk_idx, unnest(words) AS w FROM chunks),
        content AS (SELECT * FROM words
                    WHERE regexp_matches(w, '^[a-z]{{3,}}$')
                      AND NOT list_contains({_stop_array_sql("en")}, w)),
        tf AS (SELECT doc_id, w, CAST(count(*) AS BIGINT) AS tf
               FROM content GROUP BY 1, 2),
        num AS (SELECT c.doc_id, c.chunk_idx, CAST(sum(t.tf) AS BIGINT) AS num
                FROM content c JOIN tf t ON t.doc_id = c.doc_id AND t.w = c.w
                GROUP BY 1, 2),
        base AS (SELECT doc_id, chunk_idx, CAST(len(words) AS INT) AS n_tok,
                        md5(array_to_string(words, ' ')) AS passage_md5
                 FROM chunks),
        scored AS (SELECT b.doc_id, b.chunk_idx,
                          CAST(round(10000 * coalesce(n.num, 0)::DOUBLE / b.n_tok) AS BIGINT)
                            AS score_i,
                          b.n_tok, b.passage_md5
                   FROM base b LEFT JOIN num n USING (doc_id, chunk_idx))
        SELECT doc_id, chunk_idx, score_i, n_tok, passage_md5
        FROM (SELECT *, row_number() OVER (PARTITION BY doc_id
                          ORDER BY score_i DESC, chunk_idx) AS rk FROM scored)
        WHERE rk <= 2
    """
    o["host_shortest_paths_6"] = _bellman_sql(iterations=6, edges_sql=_host_edges_sql())
    o["textrank_keywords"] = f"""
        SELECT node AS word, pr_i
        FROM ({_pagerank_sql(iterations=5, damping=0.85, edges_sql=_cooc_edges_sql())})
        ORDER BY pr_i DESC, word LIMIT 20
    """
    o["pmi_collocations"] = f"""
        WITH tk AS (SELECT {_kept_tokens_sql()} AS t FROM documents),
        uni AS (SELECT tok, CAST(count(*) AS BIGINT) AS c
                FROM (SELECT unnest(t) AS tok FROM tk) GROUP BY tok),
        nt AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM uni),
        pairs AS (SELECT unnest(list_transform(generate_series(1, len(t) - 1),
                       i -> struct_pack(a := t[i], b := t[i + 1]))) AS p
                  FROM tk WHERE len(t) >= 2),
        big AS (SELECT p.a AS a, p.b AS b, CAST(count(*) AS BIGINT) AS cab
                FROM pairs GROUP BY 1, 2),
        bt AS (SELECT CAST(sum(cab) AS BIGINT) AS bt FROM big)
        SELECT g.a || ' ' || g.b AS bigram,
               g.cab AS pair_l,
               CAST(round(10000 * ln(
                 CAST(g.cab * nt.n * nt.n AS DOUBLE)
                 / CAST(bt.bt * ua.c * ub.c AS DOUBLE))) AS BIGINT) AS pmi_i
        FROM big g
        JOIN uni ua ON ua.tok = g.a
        JOIN uni ub ON ub.tok = g.b, nt, bt
        WHERE g.cab >= 5
        ORDER BY pmi_i DESC, bigram LIMIT 20
    """
    o["winnow_shared_pairs"] = (
        "WITH "
        + _winnow_sql(k=8, w=4)
        + """,
        d AS (SELECT DISTINCT doc_id AS id, fp FROM fps),
        rare AS (SELECT fp FROM d GROUP BY fp HAVING count(*) <= 50)
        SELECT a.id AS id_a, b.id AS id_b, CAST(count(*) AS BIGINT) AS shared
        FROM d a JOIN rare r ON r.fp = a.fp JOIN d b ON b.fp = a.fp AND a.id < b.id
        GROUP BY a.id, b.id HAVING count(*) >= 20
    """
    )
    o["url_template_mining"] = """
        WITH d AS (SELECT doc_id AS i FROM documents),
        g AS (SELECT i % 3 AS hh, i FROM d)
        SELECT 'h' || hh || '.example.org' AS host, '/item/{n}' AS template,
               CAST(count(*) AS BIGINT) AS n_urls,
               CAST(count(DISTINCT i) AS BIGINT) AS n_paths,
               CAST(CASE WHEN count(DISTINCT i) >= 50 THEN 1 ELSE 0 END AS INTEGER)
                 AS is_trap_i
        FROM g GROUP BY hh
        UNION ALL
        SELECT 'h' || hh || '.example.org', '/about',
               CAST(count(*) AS BIGINT), CAST(1 AS BIGINT), CAST(0 AS INTEGER)
        FROM g GROUP BY hh
        UNION ALL
        SELECT 'h' || hh || '.example.org', '/cal/{mixed}',
               CAST(count(*) AS BIGINT),
               CAST(count(DISTINCT i % 12) AS BIGINT),
               CAST(CASE WHEN count(DISTINCT i % 12) >= 50 THEN 1 ELSE 0 END
                    AS INTEGER)
        FROM g GROUP BY hh
        UNION ALL
        SELECT 'h' || hh || '.example.org', '/blob/{hex}',
               CAST(count(*) AS BIGINT),
               CAST(count(DISTINCT i % 7) AS BIGINT),
               CAST(CASE WHEN count(DISTINCT i % 7) >= 50 THEN 1 ELSE 0 END
                    AS INTEGER)
        FROM g GROUP BY hh
    """
    o["readability_scores"] = r"""
        WITH d AS (
          SELECT doc_id,
                 text || '.' || repeat(' More words here!',
                                       CAST(doc_id % 3 AS INTEGER)) AS t
          FROM documents
        ),
        c AS (
          -- coalesce AFTER the decoration: NULL text nulls the || chain
          -- (mirroring Spark's F.concat), then the operator treats NULL ≡ ''
          SELECT doc_id,
                 list_filter(regexp_split_to_array(lower(coalesce(t, '')), '\s+'),
                             w -> w <> '') AS ws,
                 greatest(1, len(regexp_extract_all(coalesce(t, ''), '[.!?]+'))) AS ns
          FROM d
        ),
        s AS (
          SELECT doc_id,
                 CAST(len(ws) AS BIGINT) AS n_words,
                 CAST(ns AS BIGINT) AS n_sentences,
                 CAST(coalesce(list_sum(list_transform(ws,
                        w -> greatest(1, len(regexp_extract_all(w, '[aeiouy]+'))))),
                      0) AS BIGINT) AS n_syllables
          FROM c
        )
        SELECT doc_id, n_words, n_sentences, n_syllables,
               -- wordless docs: NULL score per the operator contract, but the
               -- GATE needs a sentinel (nullable BIGINT -> pandas float64 on
               -- the driver path; -10^15 is outside both formulas' range)
               CASE WHEN n_words > 0 THEN CAST(
                 390000 * n_words // n_sentences
                 + 11800000 * n_syllables // n_words - 15590000 AS BIGINT)
               ELSE CAST(-1000000000000000 AS BIGINT) END AS fk_grade_i,
               CASE WHEN n_words > 0 THEN CAST(
                 206835000 - 1015000 * n_words // n_sentences
                 - 84600000 * n_syllables // n_words AS BIGINT)
               ELSE CAST(-1000000000000000 AS BIGINT) END AS fre_i
        FROM s
    """
    o["kg_functional_keys"] = f"""
        WITH t AS ({_kg_e2e_sql()}),
        facts AS (SELECT DISTINCT subj, pred, obj FROM t),
        outd AS (SELECT pred, subj, count(*) AS d_out FROM facts
                 GROUP BY pred, subj),
        ind AS (SELECT pred, obj, count(*) AS d_in FROM facts
                GROUP BY pred, obj),
        po AS (SELECT pred, CAST(sum(d_out) AS BIGINT) AS n_facts,
                      CAST(count(*) AS BIGINT) AS n_subj,
                      CAST(max(d_out) AS BIGINT) AS max_out
               FROM outd GROUP BY pred),
        pi AS (SELECT pred, CAST(count(*) AS BIGINT) AS n_obj,
                      CAST(max(d_in) AS BIGINT) AS max_in
               FROM ind GROUP BY pred)
        SELECT po.pred, n_facts, n_subj, n_obj, max_out, max_in,
               CAST(round(10000.0 * n_subj / n_facts) AS BIGINT)
                 AS func_ratio_i,
               CAST(round(10000.0 * n_obj / n_facts) AS BIGINT)
                 AS inv_func_ratio_i,
               CAST(max_out = 1 AS BIGINT) AS is_functional_i,
               CAST(max_in = 1 AS BIGINT) AS is_inverse_functional_i
        FROM po JOIN pi ON po.pred = pi.pred
    """
    o["kg_owl_inference"] = f"""
        WITH t AS ({_kg_e2e_sql()}),
        facts AS (SELECT DISTINCT subj, pred, obj FROM t),
        owns_e AS (SELECT DISTINCT subj AS src, obj AS dst FROM facts
                   WHERE pred = 'owns' AND subj <> obj),
        h2 AS (SELECT DISTINCT a.src, b.dst FROM owns_e a
               JOIN owns_e b ON a.dst = b.src),
        h3 AS (SELECT DISTINCT a.src, b.dst FROM h2 a
               JOIN owns_e b ON a.dst = b.src),
        h4 AS (SELECT DISTINCT a.src, b.dst FROM h3 a
               JOIN owns_e b ON a.dst = b.src),
        allh AS (
          SELECT src, dst, 1 AS hops FROM owns_e
          UNION ALL SELECT src, dst, 2 FROM h2
          UNION ALL SELECT src, dst, 3 FROM h3
          UNION ALL SELECT src, dst, 4 FROM h4
        ),
        minreach AS (SELECT src, dst, min(hops) AS h FROM allh
                     GROUP BY src, dst),
        cand AS (
          SELECT subj, pred, obj, 0 AS rank FROM facts
          UNION ALL
          SELECT obj, pred, subj, 1 FROM facts WHERE pred = 'partnered_with'
          UNION ALL
          SELECT obj, 'acquired_by', subj, 2 FROM facts WHERE pred = 'acquired'
          UNION ALL
          SELECT obj, 'founded', subj, 2 FROM facts WHERE pred = 'founded_by'
          UNION ALL
          SELECT src, 'owns', dst, 3 FROM minreach WHERE h >= 2
        )
        SELECT subj, pred, obj,
               CASE min(rank) WHEN 0 THEN 'asserted' WHEN 1 THEN 'symmetric'
                    WHEN 2 THEN 'inverse' ELSE 'transitive' END AS origin
        FROM cand GROUP BY subj, pred, obj
    """
    o["bmp_decode_stats"] = """
        WITH img AS (SELECT s AS i, 4 + s % 5 AS w, 3 + s % 4 AS h
                     FROM range(24) t(s)),
        xs AS (SELECT s AS x FROM range(8) t(s)),
        ys AS (SELECT s AS y FROM range(6) t(s)),
        px AS (SELECT i, w, h, x, y FROM img, xs, ys WHERE x < w AND y < h),
        sums AS (
          SELECT i, w, h,
                 CAST(sum((3 * x + 5 * y + i) % 256) AS BIGINT) AS sum_r,
                 CAST(sum((7 * x + 11 * y + 2 * i) % 256) AS BIGINT) AS sum_g,
                 CAST(sum((13 * x + 17 * y + 3 * i) % 256) AS BIGINT) AS sum_b
          FROM px GROUP BY 1, 2, 3
        )
        SELECT 'img' || i AS media_id, CAST(w AS BIGINT) AS width,
               CAST(h AS BIGINT) AS height, CAST(w * h AS BIGINT) AS n_px,
               sum_r, sum_g, sum_b,
               CAST(sum_r * 100 // (w * h) AS BIGINT) AS mean_r_i,
               CAST(sum_g * 100 // (w * h) AS BIGINT) AS mean_g_i,
               CAST(sum_b * 100 // (w * h) AS BIGINT) AS mean_b_i
        FROM sums
    """
    o["tiff_decode_stats"] = """
        WITH img AS (SELECT s AS i, 5 + s % 4 AS w, 6 + s % 5 AS h
                     FROM range(24) t(s)),
        xs AS (SELECT s AS x FROM range(8) t(s)),
        ys AS (SELECT s AS y FROM range(10) t(s)),
        px AS (SELECT i, w, h, x, y FROM img, xs, ys WHERE x < w AND y < h),
        sums AS (
          SELECT i, w, h,
                 CAST(sum((2 * x + 9 * y + i) % 256) AS BIGINT) AS sum_r,
                 CAST(sum((5 * x + 3 * y + 2 * i) % 256) AS BIGINT) AS sum_g,
                 CAST(sum((11 * x + 7 * y + 5 * i) % 256) AS BIGINT) AS sum_b
          FROM px GROUP BY 1, 2, 3
        )
        SELECT 'img' || i AS media_id, CAST(w AS BIGINT) AS width,
               CAST(h AS BIGINT) AS height, CAST(w * h AS BIGINT) AS n_px,
               sum_r, sum_g, sum_b,
               CAST(sum_r * 100 // (w * h) AS BIGINT) AS mean_r_i,
               CAST(sum_g * 100 // (w * h) AS BIGINT) AS mean_g_i,
               CAST(sum_b * 100 // (w * h) AS BIGINT) AS mean_b_i
        FROM sums
    """
    o["png_decode_stats"] = """
        WITH img AS (SELECT s AS i, 5 + s % 4 AS w, 6 + s % 5 AS h
                     FROM range(24) t(s)),
        xs AS (SELECT s AS x FROM range(8) t(s)),
        ys AS (SELECT s AS y FROM range(10) t(s)),
        px AS (SELECT i, w, h, x, y FROM img, xs, ys WHERE x < w AND y < h),
        sums AS (
          SELECT i, w, h,
                 CAST(sum((3 * x + 8 * y + 2 * i) % 256) AS BIGINT) AS sum_r,
                 CAST(sum((7 * x + 5 * y + 3 * i) % 256) AS BIGINT) AS sum_g,
                 CAST(sum((x + 13 * y + 7 * i) % 256) AS BIGINT) AS sum_b
          FROM px GROUP BY 1, 2, 3
        )
        SELECT 'img' || i AS media_id, CAST(w AS BIGINT) AS width,
               CAST(h AS BIGINT) AS height, CAST(w * h AS BIGINT) AS n_px,
               sum_r, sum_g, sum_b,
               CAST(sum_r * 100 // (w * h) AS BIGINT) AS mean_r_i,
               CAST(sum_g * 100 // (w * h) AS BIGINT) AS mean_g_i,
               CAST(sum_b * 100 // (w * h) AS BIGINT) AS mean_b_i
        FROM sums
    """
    o["gif_decode_stats"] = """
        WITH img AS (SELECT s AS i, 5 + s % 4 AS w, 6 + s % 5 AS h
                     FROM range(24) t(s)),
        xs AS (SELECT s AS x FROM range(8) t(s)),
        ys AS (SELECT s AS y FROM range(10) t(s)),
        px AS (SELECT i, w, h, (x + 2 * y + i) % 16 AS k
               FROM img, xs, ys WHERE x < w AND y < h),
        sums AS (
          SELECT i, w, h,
                 CAST(sum((7 * k + 3) % 256) AS BIGINT) AS sum_r,
                 CAST(sum((11 * k + 5) % 256) AS BIGINT) AS sum_g,
                 CAST(sum((13 * k + 9) % 256) AS BIGINT) AS sum_b
          FROM px GROUP BY 1, 2, 3
        )
        SELECT 'img' || i AS media_id, CAST(w AS BIGINT) AS width,
               CAST(h AS BIGINT) AS height, CAST(w * h AS BIGINT) AS n_px,
               sum_r, sum_g, sum_b,
               CAST(sum_r * 100 // (w * h) AS BIGINT) AS mean_r_i,
               CAST(sum_g * 100 // (w * h) AS BIGINT) AS mean_g_i,
               CAST(sum_b * 100 // (w * h) AS BIGINT) AS mean_b_i
        FROM sums
    """
    o["tracker_density"] = f"""
        WITH base AS (
          SELECT url,
                 regexp_extract(url, '^https?://([^/:?#]+)', 1) AS ph,
                 regexp_extract_all(html, '<script\\b[^>]*>', 0) AS tags,
                 regexp_extract_all(html, '<script\\b[^>]*?src="([^"]*)"', 1)
                   AS srcs
          FROM read_parquet('{_ensure_tracker_corpus()}')
        ),
        h AS (
          SELECT url, ph, CAST(len(tags) AS BIGINT) AS n_scripts, srcs,
                 list_transform(srcs,
                   s -> regexp_extract(s, '^https?://([^/:?#]+)', 1)) AS hosts
          FROM base
        )
        SELECT url, n_scripts,
               CAST(len(srcs) AS BIGINT) AS n_external,
               CAST(len(list_filter(hosts, x -> x <> '' AND x <> ph))
                    AS BIGINT) AS n_third_party,
               CAST(len(list_filter(hosts,
                    x -> regexp_matches(x, '^(analytics|pixel|tracker|ads)\\.')))
                    AS BIGINT) AS n_tracker,
               CAST(CASE WHEN n_scripts > 0 THEN
                 (len(list_filter(hosts,
                    x -> regexp_matches(x, '^(analytics|pixel|tracker|ads)\\.')))
                  * 10000) // n_scripts
               ELSE -1 END AS BIGINT) AS tracker_density_i
        FROM h
    """
    _pow2_n_sql = """
          SELECT doc_id,
                 least(CASE WHEN trim(coalesce(text, '')) = '' THEN 0
                       ELSE len(regexp_split_to_array(
                              lower(trim(coalesce(text, ''))), '\\s+'))
                       END, 4096) AS n
          FROM documents
    """
    o["seq_length_buckets"] = f"""
        WITH per AS (
          SELECT CASE WHEN n <= 1 THEN 1
                 ELSE 1 << length(bin(n - 1)) END AS bucket, n
          FROM ({_pow2_n_sql}) WHERE n > 0
        )
        SELECT CAST(bucket AS BIGINT) AS bucket,
               CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(n) AS BIGINT) AS sum_tokens,
               CAST(bucket * count(*) - sum(n) AS BIGINT) AS pad_tokens,
               CAST(((bucket * count(*) - sum(n)) * 10000)
                    // (bucket * count(*)) AS BIGINT) AS waste_i
        FROM per GROUP BY bucket
    """
    o["curriculum_order"] = f"""
        WITH per AS (
          SELECT doc_id,
                 CASE WHEN n <= 1 THEN 1
                 ELSE 1 << length(bin(n - 1)) END AS bucket,
                 md5('c:' || doc_id) AS shuf
          FROM ({_pow2_n_sql})
        )
        SELECT CAST(row_number() OVER (ORDER BY bucket, shuf, doc_id)
                    AS BIGINT) AS rank,
               doc_id, CAST(bucket AS BIGINT) AS bucket
        FROM per
    """
    o["doremi_domain_weights"] = (
        "WITH "
        + _unigram_lm_cte
        + """,
        dom AS (
          SELECT d.source AS grp, CAST(sum(l.n_tokens) AS BIGINT) AS n_tokens,
                 CAST(sum(l.sum_logp_i) AS BIGINT) AS slp
          FROM lm l JOIN documents d USING (doc_id) GROUP BY 1
        ),
        dom2 AS (
          SELECT grp, n_tokens, slp,
                 CAST((-slp) // n_tokens AS BIGINT) AS nll_mi
          FROM dom
        ),
        corpus AS (
          SELECT CAST((-sum(slp)) // sum(n_tokens) AS BIGINT) AS cn FROM dom
        ),
        w AS (
          SELECT grp, n_tokens, nll_mi,
                 CAST(greatest(0, nll_mi - cn) AS BIGINT) AS excess_mi,
                 n_tokens * (1000000 + greatest(0, nll_mi - cn)) AS score
          FROM dom2, corpus
        ),
        tot AS (SELECT CAST(sum(score) AS BIGINT) AS t FROM w)
        SELECT grp, n_tokens, nll_mi, excess_mi,
               CAST(round((CAST(score AS DOUBLE) / t) * 1000000)
                    AS BIGINT) AS weight_mi
        FROM w, tot
    """
    )
    o["kg_cliques_k4"] = f"""
        WITH t AS ({_kg_e2e_sql()}),
        ee AS (SELECT DISTINCT least(subj, obj) AS a, greatest(subj, obj) AS b
               FROM t WHERE subj <> obj
                 AND pred IN ('acquired', 'owns', 'partnered_with')),
        tri AS (
          SELECT e1.a AS a, e1.b AS b, e2.b AS c
          FROM ee e1
          JOIN ee e2 ON e2.a = e1.b
          JOIN ee e3 ON e3.a = e1.a AND e3.b = e2.b
        )
        SELECT tri.a, tri.b, tri.c, x1.b AS d
        FROM tri
        JOIN ee x1 ON x1.a = tri.a AND x1.b > tri.c
        JOIN ee x2 ON x2.a = tri.b AND x2.b = x1.b
        JOIN ee x3 ON x3.a = tri.c AND x3.b = x1.b
    """
    o["boruvka_mst_forest"] = """
        WITH RECURSIVE base AS (SELECT s AS i FROM range(40) t(s)),
        raw AS (
          SELECT i, (i + 1) % 40 AS j FROM base
          UNION ALL
          SELECT i, (i * 7 + 3) % 40 AS j FROM base
        ),
        e AS (
          SELECT DISTINCT least(i, j) AS a, greatest(i, j) AS b,
                 ('0x' || substr(md5(least(i, j) || '-' || greatest(i, j)),
                                 1, 12))::BIGINT AS w
          FROM raw WHERE i <> j
        ),
        prim AS (
          SELECT [CAST(0 AS BIGINT)] AS vis, CAST(NULL AS BIGINT) AS pa,
                 CAST(NULL AS BIGINT) AS pb, CAST(NULL AS BIGINT) AS pw,
                 0 AS step
          UNION ALL
          (SELECT list_append(p.vis,
                    CASE WHEN list_contains(p.vis, x.a) THEN x.b ELSE x.a END),
                  x.a, x.b, x.w, p.step + 1
           FROM prim p, e x
           WHERE list_contains(p.vis, x.a) <> list_contains(p.vis, x.b)
           ORDER BY x.w LIMIT 1)
        )
        SELECT pa AS a, pb AS b, pw AS w FROM prim WHERE pa IS NOT NULL
    """
    o["kg_wl_colors"] = """
        WITH e AS (
          SELECT DISTINCT
                 'E' || CAST(doc_id % 50 AS VARCHAR) AS s,
                 CASE doc_id % 2 WHEN 0 THEN 'linked_to' ELSE 'cites' END AS p,
                 'E' || CAST((doc_id * doc_id) % 7 AS VARCHAR) AS o
          FROM documents WHERE doc_id < 200
        ),
        n0 AS (
          SELECT node, '0' AS c FROM (
            SELECT s AS node FROM e UNION SELECT o FROM e)
        ),
        m1 AS (
          SELECT e.s AS node, '>' AS dir, e.p, n.c AS nbc
          FROM e JOIN n0 n ON e.o = n.node
          UNION ALL
          SELECT e.o AS node, '<' AS dir, e.p, n.c AS nbc
          FROM e JOIN n0 n ON e.s = n.node
        ),
        s1 AS (
          SELECT node, string_agg(dir || p || '=' || nbc, ','
                                  ORDER BY dir, p, nbc) AS sig
          FROM m1 GROUP BY node
        ),
        n1 AS (
          SELECT n0.node, md5(n0.c || '|' || coalesce(s1.sig, '')) AS c
          FROM n0 LEFT JOIN s1 ON n0.node = s1.node
        ),
        m2 AS (
          SELECT e.s AS node, '>' AS dir, e.p, n.c AS nbc
          FROM e JOIN n1 n ON e.o = n.node
          UNION ALL
          SELECT e.o AS node, '<' AS dir, e.p, n.c AS nbc
          FROM e JOIN n1 n ON e.s = n.node
        ),
        s2 AS (
          SELECT node, string_agg(dir || p || '=' || nbc, ','
                                  ORDER BY dir, p, nbc) AS sig
          FROM m2 GROUP BY node
        ),
        n2 AS (
          SELECT n1.node, md5(n1.c || '|' || coalesce(s2.sig, '')) AS c
          FROM n1 LEFT JOIN s2 ON n1.node = s2.node
        )
        SELECT c AS wl_color, CAST(count(*) AS BIGINT) AS n_nodes,
               min(node) AS example_node
        FROM n2 GROUP BY 1
        ORDER BY n_nodes DESC, wl_color
    """
    _vocab_values = ", ".join(f"('{p}', {c})" for p, c in sorted(_SP_VOCAB.items()))
    _dp_ctes = []
    _prev = "SELECT * FROM dp0"
    for _k in range(1, 9):
        _dp_ctes.append(f"""
        dp{_k} AS (
          SELECT w.word, {_k} AS pos,
                 min(lpad(CAST(CAST(substr(d.enc, 1, 4) AS INTEGER) + v.c AS VARCHAR), 4, '0')
                     || '|' ||
                     lpad(CAST(CAST(substr(d.enc, 6, 2) AS INTEGER) + 1 AS VARCHAR), 2, '0')
                     || '|' ||
                     CASE WHEN substr(d.enc, 9) = '' THEN v.p
                          ELSE substr(d.enc, 9) || ' ' || v.p END) AS enc
          FROM words w
          JOIN ({_prev}) d ON d.word = w.word
          JOIN vocab v ON length(v.p) = {_k} - d.pos
                      AND substr(w.word, d.pos + 1, length(v.p)) = v.p
          WHERE length(w.word) >= {_k}
          GROUP BY 1, 2
        )""")
        _prev = " UNION ALL ".join(f"SELECT * FROM dp{_j}" for _j in range(_k + 1))
    o["unigram_viterbi_segment"] = f"""
        WITH words AS (
          SELECT DISTINCT t AS word FROM (
            SELECT unnest(regexp_split_to_array(lower(text), '\\s+')) AS t
            FROM documents) WHERE t <> ''
        ),
        vocab AS (SELECT * FROM (VALUES {_vocab_values}) v(p, c)),
        dp0 AS (SELECT word, 0 AS pos, '0000|00|' AS enc FROM words),
        {",".join(_dp_ctes)}
        SELECT w.word,
               coalesce(CAST(substr(d.enc, 1, 4) AS BIGINT), -1) AS cost,
               coalesce(CAST(substr(d.enc, 6, 2) AS BIGINT), -1) AS n_pieces,
               coalesce(substr(d.enc, 9), '') AS pieces
        FROM words w
        LEFT JOIN ({_prev}) d
               ON d.word = w.word AND d.pos = length(w.word)
        ORDER BY w.word
    """
    o["landmark_distance_eval"] = (
        "\n".join(_minhop_parts(_host_edges_sql(), 6)).rstrip(",")
        + """
        , deg AS (
          SELECT node, count(*) AS c FROM (
            SELECT src AS node FROM edges
            UNION ALL SELECT dst FROM edges) GROUP BY 1
        ),
        lm AS (SELECT node FROM deg ORDER BY c DESC, node LIMIT 4),
        ul AS (  -- d(u, l), incl. the landmark's own 0
          SELECT u, lmn, min(du) AS du FROM (
            SELECT a.src AS u, l.node AS lmn, a.d AS du
            FROM d6 a JOIN lm l ON a.dst = l.node
            UNION ALL SELECT node, node, 0 FROM lm
          ) GROUP BY 1, 2
        ),
        lv AS (  -- d(l, v), incl. 0
          SELECT lmn, v, min(dv) AS dv FROM (
            SELECT l.node AS lmn, b.dst AS v, b.d AS dv
            FROM d6 b JOIN lm l ON b.src = l.node
            UNION ALL SELECT node, node, 0 FROM lm
          ) GROUP BY 1, 2
        ),
        est AS (
          SELECT ul.u, lv.v, CAST(min(ul.du + lv.dv) AS BIGINT) AS est_d
          FROM ul JOIN lv ON ul.lmn = lv.lmn GROUP BY 1, 2
        )
        SELECT x.src AS u, x.dst AS v, CAST(x.d AS BIGINT) AS exact_d,
               CAST(coalesce(est.est_d, -1) AS BIGINT) AS est_d,
               CAST(CASE WHEN est.est_d IS NOT NULL
                    THEN est.est_d * 10000 // x.d ELSE -1 END AS BIGINT)
                 AS stretch_bp
        FROM d6 x
        LEFT JOIN est ON est.u = x.src AND est.v = x.dst
        WHERE x.src <> x.dst
        ORDER BY u, v
    """
    )
    o["partition_edgecut_eval"] = f"""
        WITH he AS (
          SELECT src, dst, CAST(count(*) AS BIGINT) AS w
          FROM ({_host_edges_sql()}) GROUP BY 1, 2
        ),
        hosts AS (SELECT src AS h FROM he UNION SELECT dst FROM he),
        -- these 3-label hosts all take the last-2-labels branch of the
        -- registrable-domain rule, so the regexp mirrors it exactly
        parts AS (
          SELECT 'hash' AS scheme, h,
                 ('0x' || substr(md5(h), 1, 13))::BIGINT % 8 AS p FROM hosts
          UNION ALL
          SELECT 'domain', h,
                 ('0x' || substr(md5(
                    regexp_extract(h, '([^.]+\\.[^.]+)$', 1)), 1, 13))::BIGINT % 8
          FROM hosts
        ),
        eparts AS (
          SELECT ps.scheme, he.w,
                 CASE WHEN ps.p <> pd.p THEN 1 ELSE 0 END AS cut
          FROM he
          JOIN parts ps ON ps.h = he.src
          JOIN parts pd ON pd.h = he.dst AND pd.scheme = ps.scheme
        ),
        agg AS (
          SELECT scheme, CAST(count(*) AS BIGINT) AS n_edges,
                 CAST(sum(cut) AS BIGINT) AS cut_edges,
                 CAST(sum(cut * w) AS BIGINT) AS cut_links,
                 CAST(sum(w) AS BIGINT) AS total_links
          FROM eparts GROUP BY 1
        ),
        bal AS (
          SELECT scheme, CAST(max(c) AS BIGINT) AS mx,
                 CAST(sum(c) AS BIGINT) AS nh
          FROM (SELECT scheme, p, count(*) AS c FROM parts GROUP BY 1, 2)
          GROUP BY 1
        )
        SELECT a.scheme, CAST(8 AS BIGINT) AS n_parts, n_edges, cut_edges,
               CAST(cut_links * 10000 // total_links AS BIGINT) AS cut_bp,
               mx AS max_part_hosts,
               CAST(mx * 8 * 10000 // nh AS BIGINT) AS balance_bp
        FROM agg a JOIN bal b ON a.scheme = b.scheme
        ORDER BY a.scheme
    """
    o["date_normalize_validate"] = """
        WITH base AS (
          SELECT doc_id AS id,
                 1996 + doc_id % 9 AS y,
                 CAST(1 + doc_id % 12 AS INTEGER) AS m,
                 CAST(1 + (doc_id * 7) % 31 AS INTEGER) AS d
          FROM documents
        ),
        named AS (
          SELECT id, y, m, d,
                 (['January','February','March','April','May','June','July',
                   'August','September','October','November','December'])[m]
                   AS mon
          FROM base
        ),
        built AS (
          SELECT id, y, m, d,
                 CASE id % 5
                   WHEN 0 THEN lpad(CAST(y AS VARCHAR), 4, '0') || '-' ||
                               lpad(CAST(m AS VARCHAR), 2, '0') || '-' ||
                               lpad(CAST(d AS VARCHAR), 2, '0')
                   WHEN 1 THEN CAST(m AS VARCHAR) || '/' || CAST(d AS VARCHAR)
                               || '/' || CAST(y AS VARCHAR)
                   WHEN 2 THEN CAST(d AS VARCHAR) || '.' || CAST(m AS VARCHAR)
                               || '.' || CAST(y AS VARCHAR)
                   WHEN 3 THEN mon || ' ' || CAST(d AS VARCHAR) || ', ' ||
                               CAST(y AS VARCHAR)
                   ELSE CAST(d AS VARCHAR) || ' ' || mon || ' ' ||
                        CAST(y AS VARCHAR)
                 END AS raw
          FROM named
        ),
        judged AS (
          SELECT id, raw,
                 lpad(CAST(y AS VARCHAR), 4, '0') || '-' ||
                 lpad(CAST(m AS VARCHAR), 2, '0') || '-' ||
                 lpad(CAST(d AS VARCHAR), 2, '0') AS iso,
                 CAST(CASE WHEN d <= ([31,28,31,30,31,30,31,31,30,31,30,31])[m]
                             + (CASE WHEN m = 2 AND ((y % 4 = 0 AND y % 100 <> 0)
                                       OR y % 400 = 0) THEN 1 ELSE 0 END)
                      THEN 1 ELSE 0 END AS BIGINT) AS valid_i
          FROM built
        )
        SELECT id, raw, iso, valid_i FROM judged ORDER BY id, raw
    """
    o["ac_multi_pattern_counts"] = """
        WITH pats AS (
          SELECT * FROM (VALUES ('scan'), ('can'), ('an'), ('a a'),
                                ('table'), ('stream')) p(pat)
        )
        SELECT d.doc_id AS id, p.pat AS pattern,
               CAST(count(*) AS BIGINT) AS n_hits
        FROM documents d, pats p, range(1, 2048) r
        WHERE d.text IS NOT NULL
          AND r.range <= length(d.text) - length(p.pat) + 1
          AND substring(d.text, r.range, length(p.pat)) = p.pat
        GROUP BY 1, 2
        ORDER BY id, pattern
    """
    o["ac_equals_expr_twin"] = """
        WITH pats AS (
          SELECT * FROM (VALUES ('scan'), ('can'), ('an'), ('a a'),
                                ('table'), ('stream')) p(pat)
        ),
        hits AS (
          SELECT d.doc_id AS id, p.pat AS pattern
          FROM documents d, pats p, range(1, 2048) r
          WHERE d.text IS NOT NULL
            AND r.range <= length(d.text) - length(p.pat) + 1
            AND substring(d.text, r.range, length(p.pat)) = p.pat
          GROUP BY 1, 2
        )
        SELECT CAST(0 AS BIGINT) AS n_disagree,
               CAST((SELECT count(*) FROM hits) AS BIGINT) AS n_rows
    """
    o["kmv_jaccard_pairs"] = """
        WITH tok AS (
          SELECT source AS grp,
                 list_filter(regexp_split_to_array(lower(text), '\\s+'),
                             x -> x <> '') AS t
          FROM documents
        ),
        sh AS (
          SELECT DISTINCT grp,
                 ('0x' || substr(md5(s), 1, 13))::BIGINT AS h
          FROM (
            SELECT grp, unnest(list_transform(
                     range(1, CAST(greatest(len(t) - 1, 1) AS INTEGER)),
                     j -> array_to_string(t[j : j + 2], ' '))) AS s
            FROM tok WHERE len(t) >= 3
          )
        ),
        kept AS (
          SELECT grp, h FROM (
            SELECT grp, h, row_number() OVER (PARTITION BY grp ORDER BY h) AS rn
            FROM sh) WHERE rn <= 16
        ),
        groups AS (SELECT DISTINCT grp FROM kept),
        pairs AS (
          SELECT a.grp AS grp_a, b.grp AS grp_b
          FROM groups a JOIN groups b ON a.grp < b.grp
        ),
        cand AS (
          SELECT p.grp_a, p.grp_b, g.h,
                 max(CASE WHEN g.grp = p.grp_a THEN 1 ELSE 0 END) AS in_a,
                 max(CASE WHEN g.grp = p.grp_b THEN 1 ELSE 0 END) AS in_b
          FROM pairs p JOIN kept g ON g.grp = p.grp_a OR g.grp = p.grp_b
          GROUP BY 1, 2, 3
        ),
        topk AS (
          SELECT * FROM (
            SELECT grp_a, grp_b, h, in_a, in_b,
                   row_number() OVER (PARTITION BY grp_a, grp_b ORDER BY h) AS rn
            FROM cand) WHERE rn <= 16
        ),
        agg AS (
          SELECT grp_a, grp_b,
                 CAST(count(*) AS BIGINT) AS k_eff,
                 CAST(sum(in_a * in_b) AS BIGINT) AS n_shared,
                 max(h) AS kth_hash
          FROM topk GROUP BY 1, 2
        )
        SELECT grp_a, grp_b, k_eff, n_shared,
               CAST(n_shared * 10000 // k_eff AS BIGINT) AS jaccard_i,
               CAST(CASE WHEN k_eff < 16 THEN k_eff
                    ELSE ((k_eff - 1) * 4503599627370496) // kth_hash
                    END AS BIGINT) AS est_union,
               CAST(n_shared * (CASE WHEN k_eff < 16 THEN k_eff
                    ELSE ((k_eff - 1) * 4503599627370496) // kth_hash END)
                    // k_eff AS BIGINT) AS est_inter
        FROM agg
        ORDER BY jaccard_i DESC, grp_a, grp_b LIMIT 20
    """
    o["kmv_distinct_sketch"] = """
        WITH toks AS (
          SELECT DISTINCT grp,
                 ('0x' || substr(md5(tok), 1, 13))::BIGINT AS h
          FROM (SELECT source AS grp,
                       unnest(regexp_split_to_array(lower(text), '\\s+')) AS tok
                FROM documents)
          WHERE tok <> ''
        ),
        kept AS (
          SELECT grp, h FROM (
            SELECT grp, h,
                   row_number() OVER (PARTITION BY grp ORDER BY h) AS rn
            FROM toks) WHERE rn <= 16
        ),
        merged AS (
          SELECT grp, h FROM (
            SELECT '(all)' AS grp, h,
                   row_number() OVER (ORDER BY h) AS rn
            FROM (SELECT DISTINCT h FROM kept)) WHERE rn <= 16
        ),
        sk AS (SELECT * FROM kept UNION ALL SELECT * FROM merged),
        per AS (
          SELECT grp, CAST(count(*) AS BIGINT) AS k_used,
                 max(h) AS kth_hash
          FROM sk GROUP BY 1
        ),
        exact AS (
          SELECT grp, CAST(count(DISTINCT h) AS BIGINT) AS exact_distinct
          FROM toks GROUP BY 1
          UNION ALL
          SELECT '(all)', CAST(count(DISTINCT h) AS BIGINT) FROM toks
        ),
        est AS (
          SELECT p.grp, k_used, kth_hash,
                 CAST(CASE WHEN k_used < 16 THEN exact_distinct
                      ELSE ((k_used - 1) * 4503599627370496) // kth_hash
                      END AS BIGINT) AS est_distinct,
                 exact_distinct
          FROM per p JOIN exact e ON p.grp = e.grp
        )
        SELECT grp, k_used, kth_hash, est_distinct, exact_distinct,
               CAST((abs(est_distinct - exact_distinct) * 10000)
                    // exact_distinct AS BIGINT) AS err_i
        FROM est
    """
    o["postings_varint"] = """
        WITH toks AS (
          SELECT doc_id AS id, tok AS token
          FROM (SELECT doc_id,
                       unnest(regexp_split_to_array(lower(trim(text)), '\\s+')) AS tok
                FROM documents)
          WHERE tok <> ''
        ),
        idx AS (SELECT token, id FROM toks GROUP BY 1, 2),
        lists AS (
          SELECT token, list_sort(list(id)) AS ids,
                 CAST(count(*) AS BIGINT) AS n_docs
          FROM idx GROUP BY 1
        ),
        enc AS (
          SELECT token, n_docs,
                 array_to_string(list_transform(
                   list_transform(ids, (x, i) ->
                     CASE WHEN i = 1 THEN x ELSE x - ids[i - 1] END),
                   g -> CASE
                     WHEN g < 128 THEN lower(lpad(to_hex(g % 128), 2, '0'))
                     WHEN g < 16384 THEN
                       lower(lpad(to_hex(g % 128 + 128), 2, '0')) ||
                       lower(lpad(to_hex((g // 128) % 128), 2, '0'))
                     WHEN g < 2097152 THEN
                       lower(lpad(to_hex(g % 128 + 128), 2, '0')) ||
                       lower(lpad(to_hex((g // 128) % 128 + 128), 2, '0')) ||
                       lower(lpad(to_hex((g // 16384) % 128), 2, '0'))
                     ELSE
                       lower(lpad(to_hex(g % 128 + 128), 2, '0')) ||
                       lower(lpad(to_hex((g // 128) % 128 + 128), 2, '0')) ||
                       lower(lpad(to_hex((g // 16384) % 128 + 128), 2, '0')) ||
                       lower(lpad(to_hex((g // 2097152) % 128), 2, '0'))
                   END), '') AS hex_postings
          FROM lists
        )
        SELECT token, n_docs,
               CAST(8 * n_docs AS BIGINT) AS raw_bytes,
               CAST(length(hex_postings) // 2 AS BIGINT) AS varint_bytes,
               hex_postings,
               CAST((length(hex_postings) // 2 * 10000) // (8 * n_docs)
                    AS BIGINT) AS ratio_i
        FROM enc
        ORDER BY n_docs DESC, token LIMIT 30
    """
    o["dirichlet_ql_rank"] = """
        WITH toks AS (
          SELECT doc_id AS id, tok AS token
          FROM (SELECT doc_id,
                       unnest(regexp_split_to_array(lower(trim(text)), '\\s+')) AS tok
                FROM documents)
          WHERE tok <> ''
        ),
        idx AS (SELECT token, id, CAST(count(*) AS BIGINT) AS tf
                FROM toks GROUP BY 1, 2),
        dl AS (SELECT id, CAST(count(*) AS BIGINT) AS dl FROM toks GROUP BY 1),
        tot AS (SELECT CAST(count(*) AS BIGINT) AS ctotal FROM toks),
        q(token) AS (VALUES ('join'), ('slow'), ('customer')),
        cf AS (
          SELECT q.token, CAST(count(t.token) AS BIGINT) AS cf
          FROM q LEFT JOIN toks t ON q.token = t.token GROUP BY 1
        ),
        cand AS (SELECT DISTINCT id FROM idx JOIN q ON idx.token = q.token),
        grid AS (
          SELECT cand.id, c.token, c.cf, tot.ctotal
          FROM cand, (SELECT * FROM cf WHERE cf > 0) c, tot
        ),
        sc AS (
          SELECT g.id, coalesce(i.tf, 0) AS tf, g.cf, g.ctotal, d.dl
          FROM grid g
          LEFT JOIN idx i ON g.id = i.id AND g.token = i.token
          JOIN dl d ON g.id = d.id
        ),
        agg AS (
          SELECT id,
                 CAST(sum(CASE WHEN tf > 0 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_hit_terms,
                 CAST(sum(CAST(round(1000000 * ln(
                   (tf * ctotal + 2000 * cf) / (ctotal * (dl + 2000))
                 )) AS BIGINT)) AS BIGINT) AS score_i
          FROM sc GROUP BY 1
        )
        SELECT id, n_hit_terms, score_i FROM agg
        ORDER BY score_i DESC, id LIMIT 10
    """
    o["funnel_conversion"] = """
        WITH w AS (
          SELECT user_id,
                 list_sort(list(ts) FILTER (WHERE event_type = 'signup')) AS a0,
                 list_sort(list(ts) FILTER (WHERE event_type = 'view')) AS a1,
                 list_sort(list(ts) FILTER (WHERE event_type = 'click')) AS a2,
                 list_sort(list(ts) FILTER (WHERE event_type = 'purchase')) AS a3
          FROM events
          WHERE event_type IN ('signup', 'view', 'click', 'purchase')
          GROUP BY 1
        ),
        c0 AS (SELECT *, list_min(a0) AS t0 FROM w),
        c1 AS (SELECT *, list_min(list_filter(a1, x -> x > t0)) AS t1 FROM c0),
        c2 AS (SELECT *, list_min(list_filter(a2, x -> x > t1)) AS t2 FROM c1),
        c3 AS (SELECT *, list_min(list_filter(a3, x -> x > t2)) AS t3 FROM c2),
        u AS (SELECT CAST(count(t0) AS BIGINT) AS u0,
                     CAST(count(t1) AS BIGINT) AS u1,
                     CAST(count(t2) AS BIGINT) AS u2,
                     CAST(count(t3) AS BIGINT) AS u3
              FROM c3)
        SELECT CAST(0 AS BIGINT) AS step_idx, 'signup' AS step, u0 AS users,
               CASE WHEN u0 > 0 THEN (u0 * 1000000) // u0 END AS conv_from_prev_mi,
               CASE WHEN u0 > 0 THEN (u0 * 1000000) // u0 END AS conv_from_first_mi
        FROM u
        UNION ALL
        SELECT 1, 'view', u1,
               CASE WHEN u0 > 0 THEN (u1 * 1000000) // u0 END,
               CASE WHEN u0 > 0 THEN (u1 * 1000000) // u0 END FROM u
        UNION ALL
        SELECT 2, 'click', u2,
               CASE WHEN u1 > 0 THEN (u2 * 1000000) // u1 END,
               CASE WHEN u0 > 0 THEN (u2 * 1000000) // u0 END FROM u
        UNION ALL
        SELECT 3, 'purchase', u3,
               CASE WHEN u2 > 0 THEN (u3 * 1000000) // u2 END,
               CASE WHEN u0 > 0 THEN (u3 * 1000000) // u0 END FROM u
    """
    o["retention_cohorts"] = """
        WITH firsts AS (
          SELECT user_id,
                 CAST(date_trunc('week', min(ts)) AS DATE) AS cohort_week
          FROM events GROUP BY 1
        ),
        active AS (
          SELECT DISTINCT user_id,
                 CAST(date_trunc('week', ts) AS DATE) AS active_week
          FROM events
        ),
        j AS (
          SELECT f.cohort_week, a.user_id,
                 CAST((a.active_week - f.cohort_week) // 7 AS BIGINT)
                   AS week_offset
          FROM active a JOIN firsts f USING (user_id)
        ),
        cells AS (
          SELECT cohort_week, week_offset,
                 CAST(count(DISTINCT user_id) AS BIGINT) AS active_users
          FROM j WHERE week_offset <= 4 GROUP BY 1, 2
        ),
        sizes AS (
          SELECT cohort_week, CAST(count(*) AS BIGINT) AS sz
          FROM firsts GROUP BY 1
        )
        SELECT CAST(c.cohort_week AS VARCHAR) AS cohort_week, week_offset,
               active_users,
               CAST((active_users * 1000000) // sz AS BIGINT) AS retained_mi
        FROM cells c JOIN sizes s ON c.cohort_week = s.cohort_week
    """
    o["conversion_attribution"] = """
        WITH conv AS (
          SELECT user_id, ts AS conv_ts, event_id AS conv_id
          FROM events WHERE event_type = 'purchase'
        ),
        touch AS (
          SELECT user_id, ts, event_id, event_type
          FROM events WHERE event_type <> 'purchase'
        ),
        j AS (
          SELECT c.user_id, c.conv_ts, c.conv_id,
                 t.ts, t.event_id, t.event_type
          FROM conv c JOIN touch t USING (user_id)
          WHERE t.ts < c.conv_ts
            AND t.ts >= c.conv_ts - INTERVAL 7 DAY
        ),
        ranked AS (
          SELECT *,
                 row_number() OVER (PARTITION BY user_id, conv_id
                                    ORDER BY ts DESC, event_id DESC) AS rl,
                 row_number() OVER (PARTITION BY user_id, conv_id
                                    ORDER BY ts ASC, event_id ASC) AS rf
          FROM j
        ),
        picked AS (
          SELECT user_id, conv_id,
                 max(CASE WHEN rl = 1 THEN event_type END) AS last_touch,
                 max(CASE WHEN rf = 1 THEN event_type END) AS first_touch
          FROM ranked GROUP BY 1, 2
        ),
        credited AS (
          SELECT coalesce(p.last_touch, '(none)') AS last_touch,
                 coalesce(p.first_touch, '(none)') AS first_touch
          FROM conv c LEFT JOIN picked p
            ON c.user_id = p.user_id AND c.conv_id = p.conv_id
        )
        SELECT last_touch, first_touch,
               CAST(count(*) AS BIGINT) AS conversions
        FROM credited GROUP BY 1, 2
    """
    o["classifier_calibration_bins"] = """
        WITH scored AS (
          SELECT doc_id * 2654435761 % 10001 AS s,
                 CASE WHEN (doc_id * 1103515245 + 12345) % 10000
                      < doc_id * 2654435761 % 10001 THEN 1 ELSE 0 END AS y
          FROM documents
        ),
        per AS (
          SELECT least(s * 10 // 10000, 9) AS bin,
                 CAST(count(*) AS BIGINT) AS n,
                 sum(s) // count(*) AS mean_score_i,
                 (sum(y) * 10000) // count(*) AS pos_rate_i
          FROM scored GROUP BY 1
        ),
        gapped AS (
          SELECT bin, n, mean_score_i, pos_rate_i,
                 abs(mean_score_i - pos_rate_i) AS gap_i
          FROM per
        )
        SELECT CAST(bin AS BIGINT) AS bin, n,
               CAST(mean_score_i AS BIGINT) AS mean_score_i,
               CAST(pos_rate_i AS BIGINT) AS pos_rate_i,
               CAST(gap_i AS BIGINT) AS gap_i
        FROM gapped
        UNION ALL
        SELECT -1, CAST(sum(n) AS BIGINT), -1, -1,
               CAST(sum(n * gap_i) // sum(n) AS BIGINT)
        FROM gapped
    """
    o["grouped_kfold_assign"] = """
        WITH sizes AS (
          SELECT 'h' || CAST(doc_id * doc_id % 41 AS VARCHAR) AS grp,
                 CAST(count(*) AS BIGINT) AS n_docs
          FROM documents GROUP BY 1
        ),
        ranked AS (
          SELECT grp, n_docs,
                 CAST(row_number() OVER (ORDER BY n_docs DESC, grp ASC)
                      AS INT) AS rank
          FROM sizes
        )
        SELECT grp, n_docs, rank,
               CAST(CASE WHEN (rank - 1) % 10 < 5 THEN (rank - 1) % 10
                    ELSE 9 - (rank - 1) % 10 END AS BIGINT) AS fold
        FROM ranked
    """
    o["click_model_pbm"] = """
        WITH imp AS (
          SELECT doc_id % 7 AS query_id,
                 (doc_id // 7) % 11 AS item_id,
                 doc_id % 5 + 1 AS pos,
                 CASE WHEN doc_id * 2654435761 % 100
                      < 90 // (doc_id % 5 + 1) THEN 1 ELSE 0 END AS clicked
          FROM documents
        )
        SELECT query_id, item_id,
               CAST(count(*) AS BIGINT) AS n_impr,
               CAST(sum(clicked) AS BIGINT) AS n_clicks,
               CAST(sum(60 // pos) AS BIGINT) AS exam_w,
               CAST((sum(clicked) * 60 * 10000) // sum(60 // pos)
                    AS BIGINT) AS attract_i
        FROM imp GROUP BY 1, 2
    """
    o["scaling_law_fit"] = """
        WITH pts AS (
          SELECT 'd' || CAST(doc_id % 5 AS VARCHAR) AS grp,
                 (doc_id // 5) % 20 AS x,
                 40000 - (1000 + 137 * (doc_id % 5)) * ((doc_id // 5) % 20)
                   + doc_id * 48271 % 500 AS y
          FROM documents
        ),
        sums AS (
          SELECT grp, CAST(count(*) AS BIGINT) AS n,
                 sum(x) AS sx, sum(y) AS sy,
                 sum(x * y) AS sxy, sum(x * x) AS sxx
          FROM pts GROUP BY 1
        ),
        fit AS (
          SELECT grp, n, sx, sy,
                 CASE WHEN n * sxx - sx * sx <> 0 THEN
                   ((n * sxy - sx * sy) * 10000) // (n * sxx - sx * sx)
                 END AS slope_i
          FROM sums
        )
        SELECT grp, n, CAST(slope_i AS BIGINT) AS slope_i,
               CAST(CASE WHEN slope_i IS NOT NULL THEN
                 (sy * 10000 - slope_i * sx) // n END AS BIGINT)
                 AS intercept_i
        FROM fit
    """
    o["kg_rdf_lists"] = """
        -- closed-form expectation: list j carries items 0..(j % 4),
        -- independent of the cons-cell chain walk under test
        SELECT 'owner' || CAST(doc_id AS VARCHAR) AS owner,
               CAST(i.range AS BIGINT) AS idx,
               'item_' || CAST(doc_id AS VARCHAR) || '_'
                 || CAST(i.range AS VARCHAR) AS item
        FROM documents, range(0, 4) i
        WHERE doc_id < 30 AND i.range <= doc_id % 4
    """
    o["dawid_skene_round1"] = """
        WITH lab AS (
          SELECT doc_id AS item_id, a.range AS an,
                 'L' || CAST(CASE WHEN (doc_id * 7 + a.range * 13) % 10
                                  < a.range * 2
                        THEN (doc_id % 3 + 1 + a.range) % 3
                        ELSE doc_id % 3 END AS VARCHAR) AS lbl
          FROM documents, range(0, 5) a
          WHERE doc_id < 60
        ),
        votes AS (
          SELECT item_id, lbl, CAST(count(*) AS BIGINT) AS cnt
          FROM lab GROUP BY 1, 2
        ),
        maj AS (
          SELECT item_id, lbl AS maj_label, cnt AS maj_votes FROM (
            SELECT *, row_number() OVER (
              PARTITION BY item_id ORDER BY cnt DESC, lbl ASC) AS rn
            FROM votes) WHERE rn = 1
        ),
        acc AS (
          SELECT an,
                 (sum(CASE WHEN l.lbl = m.maj_label THEN 1 ELSE 0 END)
                  * 10000) // count(*) AS acc_i
          FROM lab l JOIN maj m USING (item_id) GROUP BY an
        ),
        wv AS (
          SELECT item_id, lbl, CAST(sum(acc_i) AS BIGINT) AS wsum
          FROM lab JOIN acc USING (an) GROUP BY 1, 2
        ),
        ds AS (
          SELECT item_id, lbl AS ds_label, wsum AS ds_weight FROM (
            SELECT *, row_number() OVER (
              PARTITION BY item_id ORDER BY wsum DESC, lbl ASC) AS rn
            FROM wv) WHERE rn = 1
        )
        SELECT m.item_id, m.maj_label, m.maj_votes, d.ds_label, d.ds_weight
        FROM maj m JOIN ds d USING (item_id)
    """
    o["kneser_ney_bigram"] = r"""
        WITH toks AS (
          SELECT doc_id,
                 list_filter(regexp_split_to_array(lower(trim(text)), '\s+'),
                             t -> t <> '') AS t
          FROM documents),
        big AS (
          SELECT unnest(CASE WHEN len(t) >= 2
                   THEN list_transform(range(1, len(t)),
                          i -> t[CAST(i AS INT)] || ' ' || t[CAST(i AS INT) + 1])
                   ELSE [] END) AS bigram
          FROM toks),
        counts AS (SELECT bigram, count(*) AS cab FROM big GROUP BY bigram),
        sp AS (
          SELECT bigram, cab,
                 string_split(bigram, ' ')[1] AS a,
                 string_split(bigram, ' ')[2] AS b
          FROM counts),
        left_t AS (SELECT a, sum(cab) AS ca, count(*) AS n1_left
                   FROM sp GROUP BY 1),
        right_t AS (SELECT b, count(*) AS n1_right FROM sp GROUP BY 1),
        nb AS (SELECT count(*) AS nb FROM counts)
        SELECT s.bigram, CAST(s.cab AS BIGINT) AS cab,
               CAST(l.ca AS BIGINT) AS ca,
               CAST(l.n1_left AS BIGINT) AS n1_left,
               CAST(r.n1_right AS BIGINT) AS n1_right,
               CAST((greatest(4 * s.cab - 3, 0) * nb.nb
                     + 3 * l.n1_left * r.n1_right) * 1000000000
                    // (4 * l.ca * nb.nb) AS BIGINT) AS p_kn_i
        FROM sp s JOIN left_t l USING (a) JOIN right_t r USING (b), nb
        WHERE s.cab >= 3
    """
    o["rouge_l_dedup_pairs"] = """
        -- closed-form planted LCS, independent of the DP under test
        WITH base AS (
          SELECT doc_id AS pair_id,
                 CAST(CASE WHEN doc_id % 5 <= 1 THEN 6
                      ELSE 7 - doc_id % 5 END AS BIGINT) AS lcs
          FROM documents WHERE doc_id < 40
        )
        SELECT pair_id, lcs,
               CAST(14 AS BIGINT) AS len_cand,
               CAST(10 AS BIGINT) AS len_ref,
               CAST(lcs * 10000 // 14 AS BIGINT) AS prec_i,
               CAST(lcs * 10000 // 10 AS BIGINT) AS rec_i,
               CAST(2 * lcs * 10000 // 24 AS BIGINT) AS f_i
        FROM base
    """
    o["bleu_ngram_precisions"] = """
        WITH p AS (
          SELECT CAST(doc_id // 2 AS BIGINT) AS pair_id,
                 max(CASE WHEN doc_id % 2 = 0 THEN text END) AS cand,
                 max(CASE WHEN doc_id % 2 = 1 THEN text END) AS ref
          FROM documents WHERE doc_id < 40 GROUP BY 1
        ),
        tok AS (
          SELECT pair_id,
                 list_filter(regexp_split_to_array(lower(cand), '\\s+'),
                             x -> x <> '') AS ct,
                 list_filter(regexp_split_to_array(lower(ref), '\\s+'),
                             x -> x <> '') AS rt
          FROM p
        ),
        spine AS (
          SELECT pair_id, CAST(n.range + 1 AS BIGINT) AS n,
                 CAST(len(ct) AS BIGINT) AS len_cand,
                 CAST(len(rt) AS BIGINT) AS len_ref, ct, rt
          FROM tok, range(4) n
        ),
        cg AS (
          SELECT pair_id, n, unnest(list_transform(
                   range(1, CAST(greatest(len_cand - n + 2, 1) AS INTEGER)),
                   j -> array_to_string(ct[j : j + CAST(n AS INTEGER) - 1], ' ')
                 )) AS gram
          FROM spine
        ),
        rg AS (
          SELECT pair_id, n, unnest(list_transform(
                   range(1, CAST(greatest(len_ref - n + 2, 1) AS INTEGER)),
                   j -> array_to_string(rt[j : j + CAST(n AS INTEGER) - 1], ' ')
                 )) AS gram
          FROM spine
        ),
        cc AS (SELECT pair_id, n, gram, count(*) AS c FROM cg GROUP BY 1,2,3),
        rc AS (SELECT pair_id, n, gram, count(*) AS c FROM rg GROUP BY 1,2,3),
        clip AS (
          SELECT cc.pair_id, cc.n,
                 CAST(sum(least(cc.c, rc.c)) AS BIGINT) AS num
          FROM cc JOIN rc ON cc.pair_id = rc.pair_id AND cc.n = rc.n
                         AND cc.gram = rc.gram
          GROUP BY 1, 2
        )
        SELECT s.pair_id, s.n,
               CAST(coalesce(clip.num, 0) AS BIGINT) AS clipped_num,
               CAST(greatest(s.len_cand - s.n + 1, 0) AS BIGINT) AS cand_den,
               s.len_cand, s.len_ref,
               CAST(CASE WHEN s.len_cand - s.n + 1 > 0 THEN
                      coalesce(clip.num, 0) * 10000 // (s.len_cand - s.n + 1)
                    ELSE -1 END AS BIGINT) AS prec_i
        FROM spine s
        LEFT JOIN clip ON s.pair_id = clip.pair_id AND s.n = clip.n
        ORDER BY s.pair_id, s.n
    """
    o["bipartite_butterflies"] = """
        WITH rel AS (
          SELECT DISTINCT 'k' || CAST(doc_id % 13 AS VARCHAR) AS key,
                          'i' || CAST(doc_id % 9 AS VARCHAR) AS item
          FROM documents
        ),
        pairs AS (
          SELECT l.item AS a, r.item AS b, count(*) AS n_common
          FROM rel l JOIN rel r ON l.key = r.key AND l.item < r.item
          GROUP BY 1, 2
        ),
        bf AS (
          SELECT a, b, n_common * (n_common - 1) // 2 AS bf
          FROM pairs WHERE n_common >= 2
        )
        SELECT item, CAST(sum(bf) AS BIGINT) AS n_butterflies FROM (
          SELECT a AS item, bf FROM bf
          UNION ALL SELECT b AS item, bf FROM bf
        ) GROUP BY 1
        UNION ALL
        SELECT '(all)', CAST(coalesce(sum(bf), 0) AS BIGINT) FROM bf
    """
    o["pq_adc_topk"] = """
        WITH fp AS (
          SELECT vec_id,
                 list_transform(embedding,
                   x -> CAST(round(CAST(x AS DOUBLE) * 1000.0) AS BIGINT)
                 ) AS fp
          FROM embeddings
        ),
        cb AS (SELECT vec_id AS code, fp AS cfp FROM fp WHERE vec_id < 16),
        q AS (SELECT fp AS qfp FROM fp WHERE vec_id = 123),
        diffs AS (
          SELECT f.vec_id, c.code, s.range AS s,
                 sum((f.fp[s.range * 8 + d.range] - c.cfp[s.range * 8 + d.range])
                   * (f.fp[s.range * 8 + d.range] - c.cfp[s.range * 8 + d.range]))
                   AS dist
          FROM fp f, cb c, range(0, 8) s, range(1, 9) d
          GROUP BY 1, 2, 3
        ),
        best AS (
          SELECT vec_id, s, code FROM (
            SELECT *, row_number() OVER (
              PARTITION BY vec_id, s ORDER BY dist, code) AS rn
            FROM diffs) WHERE rn = 1
        ),
        lut AS (
          SELECT c.code, s.range AS s,
                 sum((q.qfp[s.range * 8 + d.range] - c.cfp[s.range * 8 + d.range])
                   * (q.qfp[s.range * 8 + d.range] - c.cfp[s.range * 8 + d.range]))
                   AS qdist
          FROM cb c, q, range(0, 8) s, range(1, 9) d
          GROUP BY 1, 2
        ),
        adc AS (
          SELECT b.vec_id, CAST(sum(l.qdist) AS BIGINT) AS adc_i
          FROM best b JOIN lut l ON b.code = l.code AND b.s = l.s
          GROUP BY 1
        )
        SELECT CAST(row_number() OVER (ORDER BY adc_i, vec_id) AS BIGINT)
                 AS rank,
               vec_id, adc_i
        FROM adc ORDER BY adc_i, vec_id LIMIT 10
    """
    o["events_pivot_daily"] = """
        SELECT CAST(isodow(ts) AS INT) AS isodow,
               CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
                    AS BIGINT) AS click,
               CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
                    AS BIGINT) AS error,
               CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                    AS BIGINT) AS purchase,
               CAST(sum(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END)
                    AS BIGINT) AS signup,
               CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
                    AS BIGINT) AS view
        FROM events GROUP BY 1
    """
    o["ppjoin_jaccard_pairs"] = """
        WITH d0 AS (SELECT doc_id, text FROM documents WHERE doc_id < 300),
        alld AS (
          SELECT doc_id AS id, text FROM d0
          UNION ALL
          SELECT doc_id + 20000, text || ' zq1 zq2' FROM d0 WHERE doc_id % 5 = 0
        ),
        toks AS (
          SELECT id,
                 list_distinct(list_filter(
                   regexp_split_to_array(lower(trim(text)), '\\s+'),
                   x -> x <> '')) AS t
          FROM alld
        ),
        base AS (SELECT id, t, CAST(len(t) AS BIGINT) AS sz
                 FROM toks WHERE len(t) > 0),
        post AS (SELECT id, unnest(t) AS tok FROM base),
        pc AS (
          SELECT l.id AS a, r.id AS b, CAST(count(*) AS BIGINT) AS c
          FROM post l JOIN post r ON l.tok = r.tok AND l.id < r.id
          GROUP BY 1, 2
        ),
        v AS (
          SELECT pc.a, pc.b, ba.sz AS n_a, bb.sz AS n_b, pc.c AS n_common
          FROM pc JOIN base ba ON ba.id = pc.a JOIN base bb ON bb.id = pc.b
        )
        SELECT a, b, n_a, n_b, n_common,
               CAST((1000000 * n_common) // (n_a + n_b - n_common) AS BIGINT)
                 AS jaccard_i
        FROM v
        WHERE 1000000 * n_common >= 800000 * (n_a + n_b - n_common)
    """
    o["rake_keyphrases"] = """
        WITH toks AS (
          SELECT doc_id AS id, u.tok AS tok, u.idx AS idx
          FROM (SELECT doc_id,
                       unnest(list_transform(
                         regexp_split_to_array(lower(trim(text)), '\\s+'),
                         (x, i) -> struct_pack(tok := x, idx := i))) AS u
                FROM documents)
        ),
        flag AS (
          SELECT id, idx, tok,
                 CASE WHEN NOT regexp_matches(tok, '^[a-z]+$')
                      OR tok IN ('the','and','of','to','is','in','that','it',
                                 'was','for')
                      THEN 1 ELSE 0 END AS is_delim
          FROM toks
        ),
        runs AS (
          SELECT id, idx, tok, is_delim,
                 sum(is_delim) OVER (PARTITION BY id ORDER BY idx) AS run_id
          FROM flag
        ),
        ph AS (
          SELECT id, run_id, string_agg(tok, ' ' ORDER BY idx) AS phrase,
                 CAST(count(*) AS BIGINT) AS plen
          FROM runs WHERE is_delim = 0
          GROUP BY id, run_id
        ),
        words AS (
          SELECT r.tok AS w, p.plen
          FROM runs r JOIN ph p ON p.id = r.id AND p.run_id = r.run_id
          WHERE r.is_delim = 0
        ),
        wscore AS (
          SELECT w, CAST((10000 * sum(plen)) // count(*) AS BIGINT) AS wscore_i
          FROM words GROUP BY 1
        ),
        dphr AS (SELECT phrase, CAST(count(*) AS BIGINT) AS n_occurrences
                 FROM ph GROUP BY 1),
        pw AS (SELECT phrase, n_occurrences,
                      unnest(regexp_split_to_array(phrase, ' ')) AS w
               FROM dphr),
        sc AS (
          SELECT phrase, n_occurrences,
                 CAST(count(*) AS BIGINT) AS n_words,
                 CAST(sum(ws.wscore_i) AS BIGINT) AS score_i
          FROM pw JOIN wscore ws ON ws.w = pw.w
          GROUP BY 1, 2
        )
        SELECT phrase, n_words, n_occurrences, score_i
        FROM sc ORDER BY score_i DESC, phrase LIMIT 30
    """
    o["lexical_diversity_panel"] = """
        WITH toks AS (
          SELECT source AS grp,
                 unnest(list_filter(
                   regexp_split_to_array(lower(trim(text)), '\\s+'),
                   x -> x <> '')) AS tok
          FROM documents
        ),
        tc AS (SELECT grp, tok, CAST(count(*) AS BIGINT) AS cnt
               FROM toks GROUP BY 1, 2),
        agg AS (
          SELECT grp,
                 CAST(sum(cnt) AS BIGINT) AS n_tokens,
                 CAST(count(*) AS BIGINT) AS n_types,
                 CAST(sum(cnt * cnt) AS BIGINT) AS s2,
                 CAST(sum(CASE WHEN cnt = 1 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_hapax
          FROM tc GROUP BY 1
        )
        SELECT grp, n_tokens, n_types, n_hapax,
               CAST((1000000 * n_types) // n_tokens AS BIGINT) AS ttr_i,
               CAST((1000000 * n_hapax) // n_tokens AS BIGINT) AS hapax_i,
               CAST((1000000 * (s2 - n_tokens)) // (n_tokens * n_tokens)
                    AS BIGINT) AS yule_k_i
        FROM agg
    """
    o["l_diversity_audit"] = """
        WITH d AS (SELECT lang, source, n_chars // 100 AS chars_c FROM documents),
        vc AS (SELECT lang, source, chars_c, CAST(count(*) AS BIGINT) AS cnt
               FROM d GROUP BY 1, 2, 3),
        tot AS (SELECT lang, source, CAST(sum(cnt) AS BIGINT) AS n,
                       CAST(count(*) AS BIGINT) AS n_distinct
                FROM vc GROUP BY 1, 2),
        j AS (
          SELECT vc.lang, vc.source, t.n, t.n_distinct,
                 CAST(round(1000000 * ln(CAST(t.n AS DOUBLE) / vc.cnt))
                      AS BIGINT) * vc.cnt AS term_i
          FROM vc JOIN tot t ON t.lang = vc.lang AND t.source = vc.source
        ),
        g AS (
          SELECT lang, source, n, n_distinct,
                 CAST(sum(term_i) // max(n) AS BIGINT) AS entropy_mi
          FROM j GROUP BY 1, 2, 3, 4
        )
        SELECT lang, source, n AS n_rows, n_distinct,
               CAST(CASE WHEN n_distinct >= 3 THEN 1 ELSE 0 END AS BIGINT)
                 AS distinct_l_ok,
               entropy_mi,
               CAST(CASE WHEN entropy_mi >= 1098612 THEN 1 ELSE 0 END AS BIGINT)
                 AS entropy_l_ok
        FROM g
    """
    o["benford_quantity_audit"] = """
        WITH v AS (SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS cents
                   FROM orders),
        d AS (SELECT CAST(substr(CAST(cents AS VARCHAR), 1, 1) AS BIGINT) AS digit,
                     CAST(count(*) AS BIGINT) AS n_obs
              FROM v WHERE cents > 0 GROUP BY 1),
        tot AS (SELECT CAST(sum(n_obs) AS BIGINT) AS n_total FROM d),
        spine(digit, exp_mi) AS (VALUES
          (1, 301030), (2, 176091), (3, 124939), (4, 96910), (5, 79181),
          (6, 66947), (7, 57992), (8, 51153), (9, 45757))
        SELECT CAST(spine.digit AS BIGINT) AS digit,
               coalesce(d.n_obs, 0) AS n_obs,
               CAST(CASE WHEN coalesce(n_total, 0) = 0 THEN 0
                    ELSE (coalesce(d.n_obs, 0) * 1000000) // n_total END
                    AS BIGINT) AS obs_mi,
               CAST(spine.exp_mi AS BIGINT) AS exp_mi,
               CAST(abs(CASE WHEN coalesce(n_total, 0) = 0 THEN 0
                    ELSE (coalesce(d.n_obs, 0) * 1000000) // n_total END
                    - spine.exp_mi) AS BIGINT) AS abs_dev_mi
        FROM spine LEFT JOIN d ON d.digit = spine.digit, tot
        ORDER BY digit
    """
    o["unit_normalize_quantities"] = """
        WITH meas AS (
          SELECT doc_id AS meas_id,
                 list_extract(['m','km','cm','mi','kg','g','lb','oz','furlong'],
                              CAST(doc_id % 9 AS INT) + 1) AS unit,
                 CAST((doc_id + 1) * 137 AS BIGINT) AS value_i
          FROM documents),
        conv(unit, dimension, canonical_unit, num, den) AS (VALUES
          ('m', 'length', 'm', 1, 1), ('km', 'length', 'm', 1000, 1),
          ('cm', 'length', 'm', 1, 100), ('mi', 'length', 'm', 1609344, 1000),
          ('g', 'mass', 'g', 1, 1), ('kg', 'mass', 'g', 1000, 1),
          ('lb', 'mass', 'g', 45359237, 100000),
          ('oz', 'mass', 'g', 45359237, 1600000))
        SELECT meas_id, m.unit, value_i,
               coalesce(c.dimension, 'unknown') AS dimension,
               coalesce(c.canonical_unit, '?') AS canonical_unit,
               CAST(CASE WHEN c.num IS NOT NULL
                    THEN (value_i * c.num) // c.den ELSE -1 END AS BIGINT)
                 AS norm_value_i
        FROM meas m LEFT JOIN conv c ON c.unit = m.unit
    """
    _wp_values = ", ".join(
        f"('{p}', '{p[2:] if p.startswith('##') else p}', "
        f"{str(p.startswith('##')).upper()})"
        for p in _WP_VOCAB
    )
    _wp_stages = []
    for _k in range(1, 11):
        _wp_stages.append(f"""
        g{_k} AS (
          SELECT word, CAST(pos2 AS BIGINT) AS pos, enc2 AS enc FROM (
            SELECT g.word AS word,
                   g.pos + length(arg_max(v.form, length(v.form))) AS pos2,
                   CASE WHEN g.enc = '' THEN arg_max(v.piece, length(v.form))
                        ELSE g.enc || ' ' || arg_max(v.piece, length(v.form))
                   END AS enc2
            FROM g{_k - 1} g JOIN wpvocab v
              ON ((g.pos = 0) = (NOT v.iscont))
             AND substr(g.word, g.pos + 1, length(v.form)) = v.form
            WHERE g.pos < length(g.word)
            GROUP BY g.word, g.pos, g.enc
          )
        )""")
    _wp_all = " UNION ALL ".join(f"SELECT * FROM g{_j}" for _j in range(1, 11))
    o["wordpiece_encode"] = f"""
        WITH words AS (
          SELECT DISTINCT t AS word FROM (
            SELECT unnest(regexp_split_to_array(lower(trim(text)), '\\s+')) AS t
            FROM documents) WHERE t <> '' AND length(t) <= 10
        ),
        wpvocab(piece, form, iscont) AS (VALUES {_wp_values}),
        g0 AS (SELECT word, CAST(0 AS BIGINT) AS pos, '' AS enc FROM words),
        {",".join(_wp_stages)},
        allst AS ({_wp_all}),
        best AS (SELECT word, max(pos) AS pos, arg_max(enc, pos) AS enc
                 FROM allst GROUP BY word)
        SELECT w.word,
               CAST(CASE WHEN b.pos = length(w.word)
                    THEN len(regexp_split_to_array(b.enc, ' ')) ELSE 1 END
                    AS BIGINT) AS n_pieces,
               CASE WHEN b.pos = length(w.word) THEN b.enc
                    ELSE '[UNK]' END AS pieces,
               CAST(CASE WHEN b.pos = length(w.word) THEN 0 ELSE 1 END
                    AS BIGINT) AS is_unk
        FROM words w LEFT JOIN best b ON b.word = w.word
        ORDER BY w.word
    """
    o["association_rules_2item"] = f"""
        WITH tk AS (SELECT doc_id AS bid, {_kept_tokens_sql()} AS t
                    FROM documents),
        b AS (SELECT DISTINCT bid, unnest(t) AS item FROM tk),
        isup AS (SELECT item, CAST(count(*) AS BIGINT) AS isup
                 FROM b GROUP BY 1),
        freq AS (SELECT * FROM isup WHERE isup >= 25),
        fb AS (SELECT b.bid, b.item FROM b JOIN freq USING (item)),
        pairs AS (
          SELECT l.item AS ia, r.item AS ib, CAST(count(*) AS BIGINT) AS psup
          FROM fb l JOIN fb r ON l.bid = r.bid AND l.item < r.item
          GROUP BY 1, 2 HAVING count(*) >= 25
        ),
        nt AS (SELECT CAST(count(DISTINCT bid) AS BIGINT) AS n FROM b),
        dir AS (
          SELECT ia AS antecedent, ib AS consequent, psup FROM pairs
          UNION ALL SELECT ib, ia, psup FROM pairs
        )
        SELECT d.antecedent, d.consequent, d.psup AS supp_pair,
               fa.isup AS supp_ante, fc.isup AS supp_cons,
               CAST((1000000 * d.psup) // nt.n AS BIGINT) AS support_mi,
               CAST((1000000 * d.psup) // fa.isup AS BIGINT) AS conf_mi,
               CAST((1000000 * d.psup * nt.n) // (fa.isup * fc.isup) AS BIGINT)
                 AS lift_mi
        FROM dir d
        JOIN freq fa ON fa.item = d.antecedent
        JOIN freq fc ON fc.item = d.consequent, nt
    """
    o["ppr_push_local"] = _ppr_push_sql(
        4, _host_edges_sql(), _TRUST_SEED_HOSTS[0]
    )
    o["hard_negative_mining"] = """
        WITH toks AS (
          SELECT doc_id, unnest(regexp_split_to_array(lower(trim(text)), '\\s+')) AS token
          FROM documents
        ),
        postings AS (
          SELECT doc_id AS id, token, count(*) AS tf
          FROM toks WHERE token <> '' GROUP BY doc_id, token
        ),
        dl AS (
          SELECT doc_id AS id,
                 CAST(len(list_filter(regexp_split_to_array(lower(trim(text)), '\\s+'),
                                      t -> t <> '')) AS DOUBLE) AS dl
          FROM documents
        ),
        stats AS (SELECT CAST(count(*) AS DOUBLE) AS n_docs, avg(dl) AS avgdl FROM dl),
        q(qid, token) AS (VALUES ('q1', 'data'), ('q1', 'fast'), ('q2', 'query'),
                                 ('q2', 'slow'), ('q3', 'merge'), ('q3', 'stream')),
        dfp AS (SELECT token, count(DISTINCT id) AS df FROM postings
                WHERE token IN (SELECT DISTINCT token FROM q) GROUP BY 1),
        hits AS (SELECT q.qid, p.id, p.token, p.tf
                 FROM postings p JOIN q ON q.token = p.token),
        scored AS (
          SELECT h.qid, h.id,
                 CAST(sum(CAST(round(10000 *
                   ln(1.0 + (s.n_docs - d.df + 0.5) / (d.df + 0.5))
                   * h.tf / (h.tf + 1.2 * (1.0 - 0.75 + 0.75 * l.dl / s.avgdl))
                 ) AS BIGINT)) AS BIGINT) AS score_i
          FROM hits h JOIN dfp d USING (token) JOIN dl l ON l.id = h.id, stats s
          GROUP BY 1, 2
        ),
        pos AS (SELECT 'q' || CAST(doc_id % 3 + 1 AS VARCHAR) AS qid,
                       doc_id AS id
                FROM documents WHERE doc_id % 7 = 0),
        neg AS (SELECT s.* FROM scored s
                LEFT JOIN pos ON pos.qid = s.qid AND pos.id = s.id
                WHERE pos.id IS NULL),
        rk AS (SELECT qid, id, score_i,
                      CAST(row_number() OVER (
                        PARTITION BY qid ORDER BY score_i DESC, id) AS BIGINT)
                        AS neg_rank
               FROM neg)
        SELECT qid, id AS neg_id, score_i, neg_rank FROM rk WHERE neg_rank <= 5
    """
    o["ams_f2_sketch"] = """
        WITH toks AS (
          SELECT unnest(list_filter(
                   regexp_split_to_array(lower(trim(text)), '\\s+'),
                   x -> x <> '')) AS item
          FROM documents
        ),
        cnt AS (SELECT item, CAST(count(*) AS BIGINT) AS cnt
                FROM toks GROUP BY 1),
        ests AS (SELECT unnest(generate_series(0, 7)) AS est_id),
        signed AS (
          SELECT e.est_id,
                 CASE WHEN ('0x' || substr(
                        md5(CAST(e.est_id AS VARCHAR) || ':' || c.item),
                        1, 1))::BIGINT % 2 = 0
                      THEN c.cnt ELSE -c.cnt END AS signed
          FROM cnt c, ests e
        ),
        z AS (SELECT est_id, CAST(sum(signed) AS BIGINT) AS z
              FROM signed GROUP BY 1),
        exact AS (SELECT CAST(sum(cnt * cnt) AS BIGINT) AS f2_exact FROM cnt)
        SELECT CAST(est_id AS BIGINT) AS est_id, z,
               CAST(z * z AS BIGINT) AS f2_est, f2_exact
        FROM z, exact ORDER BY est_id
    """
    o["timeseries_gorilla_bits"] = """
        WITH t AS (SELECT user_id AS series,
                          CAST(floor(epoch(ts)) AS BIGINT) AS t
                   FROM events),
        l AS (SELECT series, t,
                     lag(t, 1) OVER (PARTITION BY series ORDER BY t) AS t1,
                     lag(t, 2) OVER (PARTITION BY series ORDER BY t) AS t2
              FROM t),
        b AS (
          SELECT series,
                 CASE WHEN t1 IS NULL THEN 64
                      WHEN t2 IS NULL THEN 36
                      WHEN (t - t1) - (t1 - t2) = 0 THEN 1
                      WHEN (t - t1) - (t1 - t2) BETWEEN -63 AND 64 THEN 9
                      WHEN (t - t1) - (t1 - t2) BETWEEN -255 AND 256 THEN 12
                      WHEN (t - t1) - (t1 - t2) BETWEEN -2047 AND 2048 THEN 16
                      ELSE 36 END AS bits
          FROM l
        ),
        agg AS (SELECT series, CAST(count(*) AS BIGINT) AS n_points,
                       CAST(sum(bits) AS BIGINT) AS gorilla_bits
                FROM b GROUP BY 1)
        SELECT series, n_points,
               CAST(n_points * 8 AS BIGINT) AS raw_bytes,
               gorilla_bits,
               CAST((gorilla_bits + 7) // 8 AS BIGINT) AS gorilla_bytes,
               CAST((n_points * 8 * 10000) // ((gorilla_bits + 7) // 8)
                    AS BIGINT) AS ratio_i
        FROM agg
    """
    o["string_periodicity"] = """
        WITH src AS (
          SELECT CAST(doc_id AS VARCHAR) AS id,
                 substr(CASE WHEN doc_id % 5 = 0
                        THEN repeat(substr(coalesce(text, ''), 1, 20), 10)
                        ELSE coalesce(text, '') END, 1, 200) AS s
          FROM documents
        ),
        nn AS (SELECT id, s, CAST(length(s) AS BIGINT) AS n FROM src),
        spine AS (SELECT unnest(generate_series(1, 199)) AS p),
        cand AS (
          SELECT nn.id, spine.p
          FROM nn JOIN spine ON spine.p < nn.n
          WHERE substr(nn.s, 1, CAST(nn.n - spine.p AS INT))
                  = substr(nn.s, CAST(spine.p + 1 AS INT),
                           CAST(nn.n - spine.p AS INT))
        ),
        per AS (
          SELECT nn.id, nn.n,
                 CAST(coalesce(min(c.p), nn.n) AS BIGINT) AS period
          FROM nn LEFT JOIN cand c ON c.id = nn.id
          GROUP BY 1, 2
        )
        SELECT id, n, period,
               CAST(CASE WHEN period > 0 THEN n // period ELSE 0 END AS BIGINT)
                 AS n_units,
               CAST(CASE WHEN n > 0 AND period <= n // 2 AND n % period = 0
                    THEN 1 ELSE 0 END AS BIGINT) AS is_periodic
        FROM per ORDER BY id
    """
    o["http_revalidation_plan"] = """
        WITH st AS (
          SELECT 'u' || CAST(doc_id AS VARCHAR) AS url,
                 CAST(1700000000 + (doc_id % 400) * 10000 AS BIGINT) AS fetched_ep,
                 CASE WHEN doc_id % 3 = 0
                      THEN 'W/"e' || CAST(doc_id AS VARCHAR) || '"' END AS etag,
                 CAST(CASE WHEN doc_id % 2 = 0
                      THEN 1700000000 + (doc_id % 400) * 10000
                           - (doc_id + 1) * 20000 END AS BIGINT) AS lm_ep,
                 CAST(CASE WHEN doc_id % 5 = 0
                      THEN (doc_id % 48) * 90000 END AS BIGINT) AS max_age_s
          FROM documents
        )
        SELECT url,
               CAST(1704067200 - fetched_ep AS BIGINT) AS age_s,
               CAST(CASE WHEN max_age_s IS NULL AND lm_ep IS NOT NULL
                    THEN fetched_ep - lm_ep ELSE -1 END AS BIGINT) AS lifetime_s,
               CASE
                 WHEN max_age_s IS NOT NULL
                      AND 1704067200 - fetched_ep < max_age_s THEN 'fresh'
                 WHEN max_age_s IS NULL AND lm_ep IS NOT NULL
                      AND (1704067200 - fetched_ep) * 10 < fetched_ep - lm_ep
                      THEN 'fresh_heuristic'
                 WHEN etag IS NOT NULL THEN 'revalidate_etag'
                 WHEN lm_ep IS NOT NULL THEN 'revalidate_lm'
                 ELSE 'refetch' END AS decision,
               CASE
                 WHEN (max_age_s IS NOT NULL
                       AND 1704067200 - fetched_ep < max_age_s)
                   OR (max_age_s IS NULL AND lm_ep IS NOT NULL
                       AND (1704067200 - fetched_ep) * 10 < fetched_ep - lm_ep)
                   THEN ''
                 WHEN etag IS NOT NULL THEN 'if-none-match'
                 WHEN lm_ep IS NOT NULL THEN 'if-modified-since'
                 ELSE '' END AS cond_header
        FROM st
    """
    o["autocomplete_prefix_topk"] = """
        WITH vocab AS (
          SELECT t AS term, CAST(count(*) AS BIGINT) AS freq
          FROM (SELECT unnest(regexp_split_to_array(lower(trim(text)), '\\s+')) AS t
                FROM documents)
          WHERE t <> '' AND length(t) >= 2 GROUP BY 1
        ),
        lens AS (SELECT unnest(generate_series(2, 5)) AS L),
        pref AS (
          SELECT v.term, v.freq,
                 substr(v.term, 1, CAST(l.L AS INT)) AS prefix
          FROM vocab v JOIN lens l ON l.L <= length(v.term)
        ),
        rk AS (
          SELECT prefix, term, freq,
                 CAST(row_number() OVER (
                   PARTITION BY prefix ORDER BY freq DESC, term) AS BIGINT) AS rnk
          FROM pref
        )
        SELECT prefix, term, freq, rnk FROM rk WHERE rnk <= 3
    """
    o["matryoshka_overlap_eval"] = """
        WITH fp AS (
          SELECT vec_id,
                 list_transform(embedding,
                   x -> CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS fp
          FROM embeddings
        ),
        q AS (SELECT vec_id AS qid, fp AS qfp FROM fp WHERE vec_id < 5),
        dms AS (SELECT unnest([16, 32, 64]) AS d),
        scored AS (
          SELECT q.qid, f.vec_id AS nid, dms.d AS dims,
                 CAST(list_dot_product(list_slice(q.qfp, 1, dms.d),
                                       list_slice(f.fp, 1, dms.d))
                      AS BIGINT) AS dot
          FROM fp f, q, dms WHERE f.vec_id <> q.qid
        ),
        rk AS (SELECT qid, nid, dims,
                      row_number() OVER (
                        PARTITION BY qid, dims ORDER BY dot DESC, nid) AS rnk
               FROM scored),
        top AS (SELECT qid, nid, dims FROM rk WHERE rnk <= 10),
        full64 AS (SELECT qid, nid FROM top WHERE dims = 64)
        SELECT t.qid AS query_id, CAST(t.dims AS BIGINT) AS dims,
               CAST(sum(CASE WHEN f.nid IS NOT NULL THEN 1 ELSE 0 END)
                    AS BIGINT) AS overlap_at_k
        FROM top t LEFT JOIN full64 f ON f.qid = t.qid AND f.nid = t.nid
        GROUP BY 1, 2 ORDER BY query_id, dims
    """
    o["kg_complex_score"] = """
        WITH t AS (
          SELECT DISTINCT
                 'Entity_' || (doc_id % 40) AS subj,
                 CASE doc_id % 3 WHEN 0 THEN 'founded'
                                 WHEN 1 THEN 'acquired'
                                 ELSE 'based_in' END AS pred,
                 'Entity_' || ((doc_id * 7 + 1) % 40) AS obj
          FROM documents)
        SELECT subj, pred, obj,
               CAST(list_aggregate(list_transform(range(0, 16), i ->
                   ((('0x' || substr(md5('re:' || subj || ':' || i), 1, 8))::BIGINT % 2001) - 1000)
                 * ((('0x' || substr(md5('re:rel:' || pred || ':' || i), 1, 8))::BIGINT % 2001) - 1000)
                 * ((('0x' || substr(md5('re:' || obj || ':' || i), 1, 8))::BIGINT % 2001) - 1000)
                 + ((('0x' || substr(md5('im:' || subj || ':' || i), 1, 8))::BIGINT % 2001) - 1000)
                 * ((('0x' || substr(md5('re:rel:' || pred || ':' || i), 1, 8))::BIGINT % 2001) - 1000)
                 * ((('0x' || substr(md5('im:' || obj || ':' || i), 1, 8))::BIGINT % 2001) - 1000)
                 + ((('0x' || substr(md5('re:' || subj || ':' || i), 1, 8))::BIGINT % 2001) - 1000)
                 * ((('0x' || substr(md5('im:rel:' || pred || ':' || i), 1, 8))::BIGINT % 2001) - 1000)
                 * ((('0x' || substr(md5('im:' || obj || ':' || i), 1, 8))::BIGINT % 2001) - 1000)
                 - ((('0x' || substr(md5('im:' || subj || ':' || i), 1, 8))::BIGINT % 2001) - 1000)
                 * ((('0x' || substr(md5('im:rel:' || pred || ':' || i), 1, 8))::BIGINT % 2001) - 1000)
                 * ((('0x' || substr(md5('re:' || obj || ':' || i), 1, 8))::BIGINT % 2001) - 1000)
               ), 'sum') AS BIGINT) AS score_i
        FROM t
    """
    o["sample_budget_apportionment"] = """
        WITH w AS (SELECT source AS key, CAST(sum(n_chars) AS BIGINT) AS weight
                   FROM documents GROUP BY 1),
        tot AS (SELECT CAST(sum(weight) AS BIGINT) AS wsum FROM w),
        qq AS (SELECT key, weight,
                      CAST((1000 * weight) // wsum AS BIGINT) AS base_alloc,
                      CAST((1000 * weight) % wsum AS BIGINT) AS rem
               FROM w, tot),
        r AS (SELECT CAST(1000 - sum(base_alloc) AS BIGINT) AS n_extra FROM qq),
        rk AS (SELECT qq.*, row_number() OVER (ORDER BY rem DESC, key) AS _rk
               FROM qq)
        SELECT key, weight, base_alloc,
               CAST(base_alloc + CASE WHEN _rk <= r.n_extra AND rem > 0
                    THEN 1 ELSE 0 END AS BIGINT) AS alloc
        FROM rk, r
    """
    o["greedy_source_cover"] = """
        WITH inc AS (SELECT DISTINCT p_brand AS src,
                           p_type || '#' || p_size AS item FROM part),
        g1 AS (SELECT src, CAST(count(DISTINCT item) AS BIGINT) AS gain
                FROM inc GROUP BY 1),
        w1 AS (SELECT src, gain FROM g1 ORDER BY gain DESC, src LIMIT 1),
        c1 AS (SELECT DISTINCT i.item FROM inc i JOIN w1 USING (src)),
        u1 AS (SELECT i.src, i.item FROM inc i
                LEFT JOIN c1 cc ON cc.item = i.item WHERE cc.item IS NULL),
        g2 AS (SELECT src, CAST(count(DISTINCT item) AS BIGINT) AS gain
                FROM u1 GROUP BY 1),
        w2 AS (SELECT src, gain FROM g2 ORDER BY gain DESC, src LIMIT 1),
        c2 AS (SELECT DISTINCT i.item FROM u1 i JOIN w2 USING (src)),
        u2 AS (SELECT i.src, i.item FROM u1 i
                LEFT JOIN c2 cc ON cc.item = i.item WHERE cc.item IS NULL),
        g3 AS (SELECT src, CAST(count(DISTINCT item) AS BIGINT) AS gain
                FROM u2 GROUP BY 1),
        w3 AS (SELECT src, gain FROM g3 ORDER BY gain DESC, src LIMIT 1),
        c3 AS (SELECT DISTINCT i.item FROM u2 i JOIN w3 USING (src)),
        u3 AS (SELECT i.src, i.item FROM u2 i
                LEFT JOIN c3 cc ON cc.item = i.item WHERE cc.item IS NULL),
        g4 AS (SELECT src, CAST(count(DISTINCT item) AS BIGINT) AS gain
                FROM u3 GROUP BY 1),
        w4 AS (SELECT src, gain FROM g4 ORDER BY gain DESC, src LIMIT 1),
        c4 AS (SELECT DISTINCT i.item FROM u3 i JOIN w4 USING (src)),
        u4 AS (SELECT i.src, i.item FROM u3 i
                LEFT JOIN c4 cc ON cc.item = i.item WHERE cc.item IS NULL),
        picks AS (SELECT 1 AS round, src, gain FROM w1
          UNION ALL SELECT 2 AS round, src, gain FROM w2
          UNION ALL SELECT 3 AS round, src, gain FROM w3
          UNION ALL SELECT 4 AS round, src, gain FROM w4)
        SELECT CAST(round AS BIGINT) AS round, src AS source, gain,
               CAST(sum(gain) OVER (ORDER BY round) AS BIGINT) AS covered_total
        FROM picks
    """
    o["densest_subgraph_peel"] = """
        WITH d0 AS (SELECT doc_id FROM documents),
        core AS (SELECT DISTINCT doc_id % 8 AS v FROM d0),
        raw AS (
          SELECT 'c' || x.v AS src, 'c' || y.v AS dst
          FROM core x, core y WHERE x.v < y.v
          UNION ALL
          SELECT 'r' || doc_id, 'r' || ((doc_id + 1) % 20)
          FROM d0 WHERE doc_id < 20
          UNION ALL
          SELECT 'l' || doc_id, 'c0' FROM d0 WHERE doc_id < 30
        ),
        he AS (
          SELECT least(src, dst) AS a, greatest(src, dst) AS b
          FROM raw WHERE src <> dst
        ),
        e0 AS MATERIALIZED (SELECT DISTINCT a, b FROM he),
        d1 AS MATERIALIZED (SELECT node, CAST(count(*) AS BIGINT) AS deg
                FROM (SELECT a AS node FROM e0
                      UNION ALL SELECT b FROM e0) GROUP BY 1),
        t1 AS (SELECT CAST(count(*) AS BIGINT) AS n_nodes,
                        CAST(coalesce(sum(deg) // 2, 0) AS BIGINT) AS n_edges
                 FROM d1),
        s1 AS (SELECT CAST(1 AS BIGINT) AS round, n_nodes, n_edges,
                        CAST(CASE WHEN n_nodes = 0 THEN 0
                             ELSE (10000 * n_edges) // n_nodes END AS BIGINT)
                          AS density_mi
                 FROM t1),
        k1 AS (SELECT node FROM d1, t1
                 WHERE deg * n_nodes * 10 > 22 * n_edges),
        e1 AS MATERIALIZED (SELECT e.a, e.b FROM e0 e
                 JOIN k1 ka ON ka.node = e.a
                 JOIN k1 kb ON kb.node = e.b),
        d2 AS MATERIALIZED (SELECT node, CAST(count(*) AS BIGINT) AS deg
                FROM (SELECT a AS node FROM e1
                      UNION ALL SELECT b FROM e1) GROUP BY 1),
        t2 AS (SELECT CAST(count(*) AS BIGINT) AS n_nodes,
                        CAST(coalesce(sum(deg) // 2, 0) AS BIGINT) AS n_edges
                 FROM d2),
        s2 AS (SELECT CAST(2 AS BIGINT) AS round, n_nodes, n_edges,
                        CAST(CASE WHEN n_nodes = 0 THEN 0
                             ELSE (10000 * n_edges) // n_nodes END AS BIGINT)
                          AS density_mi
                 FROM t2),
        k2 AS (SELECT node FROM d2, t2
                 WHERE deg * n_nodes * 10 > 22 * n_edges),
        e2 AS MATERIALIZED (SELECT e.a, e.b FROM e1 e
                 JOIN k2 ka ON ka.node = e.a
                 JOIN k2 kb ON kb.node = e.b),
        d3 AS MATERIALIZED (SELECT node, CAST(count(*) AS BIGINT) AS deg
                FROM (SELECT a AS node FROM e2
                      UNION ALL SELECT b FROM e2) GROUP BY 1),
        t3 AS (SELECT CAST(count(*) AS BIGINT) AS n_nodes,
                        CAST(coalesce(sum(deg) // 2, 0) AS BIGINT) AS n_edges
                 FROM d3),
        s3 AS (SELECT CAST(3 AS BIGINT) AS round, n_nodes, n_edges,
                        CAST(CASE WHEN n_nodes = 0 THEN 0
                             ELSE (10000 * n_edges) // n_nodes END AS BIGINT)
                          AS density_mi
                 FROM t3),
        k3 AS (SELECT node FROM d3, t3
                 WHERE deg * n_nodes * 10 > 22 * n_edges),
        e3 AS MATERIALIZED (SELECT e.a, e.b FROM e2 e
                 JOIN k3 ka ON ka.node = e.a
                 JOIN k3 kb ON kb.node = e.b),
        d4 AS MATERIALIZED (SELECT node, CAST(count(*) AS BIGINT) AS deg
                FROM (SELECT a AS node FROM e3
                      UNION ALL SELECT b FROM e3) GROUP BY 1),
        t4 AS (SELECT CAST(count(*) AS BIGINT) AS n_nodes,
                        CAST(coalesce(sum(deg) // 2, 0) AS BIGINT) AS n_edges
                 FROM d4),
        s4 AS (SELECT CAST(4 AS BIGINT) AS round, n_nodes, n_edges,
                        CAST(CASE WHEN n_nodes = 0 THEN 0
                             ELSE (10000 * n_edges) // n_nodes END AS BIGINT)
                          AS density_mi
                 FROM t4),
        k4 AS (SELECT node FROM d4, t4
                 WHERE deg * n_nodes * 10 > 22 * n_edges),
        e4 AS MATERIALIZED (SELECT e.a, e.b FROM e3 e
                 JOIN k4 ka ON ka.node = e.a
                 JOIN k4 kb ON kb.node = e.b),
        d5 AS MATERIALIZED (SELECT node, CAST(count(*) AS BIGINT) AS deg
                FROM (SELECT a AS node FROM e4
                      UNION ALL SELECT b FROM e4) GROUP BY 1),
        t5 AS (SELECT CAST(count(*) AS BIGINT) AS n_nodes,
                        CAST(coalesce(sum(deg) // 2, 0) AS BIGINT) AS n_edges
                 FROM d5),
        s5 AS (SELECT CAST(5 AS BIGINT) AS round, n_nodes, n_edges,
                        CAST(CASE WHEN n_nodes = 0 THEN 0
                             ELSE (10000 * n_edges) // n_nodes END AS BIGINT)
                          AS density_mi
                 FROM t5),
        k5 AS (SELECT node FROM d5, t5
                 WHERE deg * n_nodes * 10 > 22 * n_edges),
        e5 AS MATERIALIZED (SELECT e.a, e.b FROM e4 e
                 JOIN k5 ka ON ka.node = e.a
                 JOIN k5 kb ON kb.node = e.b),
        allr AS (SELECT * FROM s1
          UNION ALL SELECT * FROM s2
          UNION ALL SELECT * FROM s3
          UNION ALL SELECT * FROM s4
          UNION ALL SELECT * FROM s5),
        best AS (SELECT density_mi AS bd, round AS br FROM allr
                 ORDER BY density_mi DESC, round LIMIT 1)
        SELECT r.round, r.n_nodes, r.n_edges, r.density_mi,
               CAST(CASE WHEN r.density_mi = b.bd AND r.round = b.br
                    THEN 1 ELSE 0 END AS BIGINT) AS is_best
        FROM allr r, best b
        ORDER BY r.round
    """
    o["chi2_feature_selection"] = f"""
        WITH base AS (
          SELECT doc_id AS id,
                 CASE WHEN doc_id % 3 = 0 THEN 1 ELSE 0 END AS lbl,
                 {_kept_tokens_sql()} AS t
          FROM documents
        ),
        pres AS (SELECT DISTINCT id, lbl, unnest(t) AS item FROM base),
        cells AS (
          SELECT item,
                 CAST(sum(CASE WHEN lbl = 1 THEN 1 ELSE 0 END) AS BIGINT) AS a,
                 CAST(sum(CASE WHEN lbl = 1 THEN 0 ELSE 1 END) AS BIGINT) AS b
          FROM pres GROUP BY 1
        ),
        tot AS (
          SELECT CAST(sum(CASE WHEN lbl = 1 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_pos,
                 CAST(sum(CASE WHEN lbl = 1 THEN 0 ELSE 1 END) AS BIGINT)
                   AS n_neg
          FROM (SELECT DISTINCT id, lbl FROM pres)
        ),
        sc AS (
          SELECT item, a, b,
                 CAST(n_pos - a AS BIGINT) AS c, CAST(n_neg - b AS BIGINT) AS d,
                 CAST(CASE WHEN (a+b) = 0 OR ((n_pos-a)+(n_neg-b)) = 0
                             OR (a+(n_pos-a)) = 0 OR (b+(n_neg-b)) = 0 THEN 0
                      ELSE round(10000 * ((CAST((n_pos + n_neg)
                              * (a*(n_neg-b) - b*(n_pos-a)) AS DOUBLE)
                            * CAST(a*(n_neg-b) - b*(n_pos-a) AS DOUBLE))
                           / (CAST((a+b) * ((n_pos-a)+(n_neg-b)) AS DOUBLE)
                              * CAST((a+(n_pos-a)) * (b+(n_neg-b)) AS DOUBLE))))
                      END AS BIGINT) AS chi2_i
          FROM cells, tot
        )
        SELECT item, a, b, c, d, chi2_i FROM sc
        ORDER BY chi2_i DESC, item LIMIT 30
    """
    o["mcnemar_paired_test"] = """
        WITH d AS (
          SELECT CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 0 END AS sa,
                 CASE WHEN doc_id % 3 <> 0 THEN 1 ELSE 0 END AS sb
          FROM documents
        ),
        agg AS (
          SELECT CAST(sum(CASE WHEN sa = 1 AND sb = 1 THEN 1 ELSE 0 END)
                      AS BIGINT) AS n_both_right,
                 CAST(sum(CASE WHEN sa = 1 AND sb = 0 THEN 1 ELSE 0 END)
                      AS BIGINT) AS n_only_a,
                 CAST(sum(CASE WHEN sa = 0 AND sb = 1 THEN 1 ELSE 0 END)
                      AS BIGINT) AS n_only_b,
                 CAST(sum(CASE WHEN sa = 0 AND sb = 0 THEN 1 ELSE 0 END)
                      AS BIGINT) AS n_both_wrong
          FROM d
        )
        SELECT n_both_right, n_only_a, n_only_b, n_both_wrong,
               CAST(CASE WHEN n_only_a + n_only_b = 0 THEN 0
                    ELSE (10000 * greatest(abs(n_only_a - n_only_b) - 1, 0)
                          * greatest(abs(n_only_a - n_only_b) - 1, 0))
                         // (n_only_a + n_only_b) END AS BIGINT) AS chi2_i
        FROM agg
    """
    o["measurement_facts_normalized"] = """
        WITH src AS (
          SELECT doc_id AS id,
                 'Item' || doc_id || ' weighs ' || (doc_id + 1) || '.'
                 || (doc_id % 10) || ' '
                 || list_extract(['m','km','cm','mi','kg','g','lb','oz','furlong'],
                                 CAST(doc_id % 9 AS INT) + 1)
                 || ' per the spec. Decoy weighs fast units.' AS text
          FROM documents
        ),
        lists AS (
          SELECT id,
                 regexp_extract_all(text,
                   '([A-Za-z][A-Za-z0-9_]*) (?:weighs|measures|spans) ([0-9]+(?:\\.[0-9]+)?) (km|cm|mi|kg|lb|oz|m|g)\\b',
                   1) AS la,
                 regexp_extract_all(text,
                   '([A-Za-z][A-Za-z0-9_]*) (?:weighs|measures|spans) ([0-9]+(?:\\.[0-9]+)?) (km|cm|mi|kg|lb|oz|m|g)\\b',
                   2) AS ln,
                 regexp_extract_all(text,
                   '([A-Za-z][A-Za-z0-9_]*) (?:weighs|measures|spans) ([0-9]+(?:\\.[0-9]+)?) (km|cm|mi|kg|lb|oz|m|g)\\b',
                   3) AS lu
          FROM src
        ),
        rx AS (
          SELECT id, u.m.subj AS subj, u.m.num AS num, u.m.unit AS unit
          FROM (SELECT id,
                       unnest(list_transform(generate_series(1, len(la)),
                         i -> struct_pack(subj := la[i], num := ln[i],
                                          unit := lu[i]))) AS m
                FROM lists) u(id, m)
        ),
        m AS (
          SELECT id, subj,
                 CAST(round(CAST(num AS DOUBLE) * 10000) AS BIGINT) AS value_i,
                 unit
          FROM rx
        ),
        conv(unit, dimension, canonical_unit, num, den) AS (VALUES
          ('m', 'length', 'm', 1, 1), ('km', 'length', 'm', 1000, 1),
          ('cm', 'length', 'm', 1, 100), ('mi', 'length', 'm', 1609344, 1000),
          ('g', 'mass', 'g', 1, 1), ('kg', 'mass', 'g', 1000, 1),
          ('lb', 'mass', 'g', 45359237, 100000),
          ('oz', 'mass', 'g', 45359237, 1600000))
        SELECT m.id, m.subj, m.value_i, m.unit,
               coalesce(c.dimension, 'unknown') AS dimension,
               coalesce(c.canonical_unit, '?') AS canonical_unit,
               CAST(CASE WHEN c.num IS NOT NULL
                    THEN (m.value_i * c.num) // c.den ELSE -1 END AS BIGINT)
                 AS norm_value_i
        FROM m LEFT JOIN conv c ON c.unit = m.unit
    """
    o["mutual_nn_pairs"] = """
        WITH fp AS (
          SELECT vec_id,
                 list_transform(embedding,
                   x -> CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS fp
          FROM embeddings WHERE vec_id < 120
        ),
        pairs AS (
          SELECT l.vec_id AS src, r.vec_id AS dst,
                 CAST(list_dot_product(l.fp, r.fp) AS BIGINT) AS dot_i
          FROM fp l JOIN fp r ON l.vec_id <> r.vec_id
        ),
        top AS (
          SELECT src, dst, dot_i,
                 row_number() OVER (PARTITION BY src
                                    ORDER BY dot_i DESC, dst) AS rk
          FROM pairs
        ),
        fwd AS (SELECT src, dst, dot_i FROM top WHERE rk <= 2)
        SELECT x.src AS a, x.dst AS b, x.dot_i
        FROM fwd x JOIN fwd y ON x.src = y.dst AND x.dst = y.src
        WHERE x.src < x.dst
    """
    o["skyline_pareto_docs"] = """
        WITH d AS (
          SELECT doc_id AS id,
                 CAST(n_chars AS BIGINT) AS len_score,
                 CAST(doc_id % 97 AS BIGINT) AS fresh_score,
                 CAST((doc_id * 3) % 89 AS BIGINT) AS link_score
          FROM documents
        )
        SELECT a.id, a.len_score, a.fresh_score, a.link_score
        FROM d a
        WHERE NOT EXISTS (
          SELECT 1 FROM d b
          WHERE b.id <> a.id
            AND b.len_score >= a.len_score
            AND b.fresh_score >= a.fresh_score
            AND b.link_score >= a.link_score
            AND (b.len_score > a.len_score
                 OR b.fresh_score > a.fresh_score
                 OR b.link_score > a.link_score)
        )
    """
    o["lt_cascade_influence"] = """
        WITH raw AS (
          SELECT 'n' || (doc_id % 40) AS src,
                 'n' || ((doc_id * 7 + 1) % 40) AS dst,
                 CAST(doc_id % 5 + 1 AS BIGINT) AS w
          FROM documents
        ),
        e AS MATERIALIZED (
          SELECT src, dst, CAST(sum(w) AS BIGINT) AS w
          FROM raw WHERE src <> dst GROUP BY 1, 2
        ),
        ti AS (SELECT dst, CAST(sum(w) AS BIGINT) AS total_w FROM e GROUP BY 1),
        a0 AS (SELECT 'n' || CAST(i AS VARCHAR) AS node,
                      CAST(0 AS BIGINT) AS activated_round
               FROM unnest(generate_series(0, 5)) t(i)),
        aw1 AS (
          SELECT e.dst, CAST(sum(e.w) AS BIGINT) AS aw
          FROM e JOIN a0 a ON a.node = e.src GROUP BY 1),
        n1 AS (
          SELECT aw1.dst AS node
          FROM aw1 JOIN ti ON ti.dst = aw1.dst
          WHERE aw1.aw * 3 >= ti.total_w * 1
            AND aw1.dst NOT IN (SELECT node FROM a0)),
        a1 AS (
          SELECT node, activated_round FROM a0
          UNION ALL
          SELECT node, CAST(1 AS BIGINT) FROM n1),
        aw2 AS (
          SELECT e.dst, CAST(sum(e.w) AS BIGINT) AS aw
          FROM e JOIN a1 a ON a.node = e.src GROUP BY 1),
        n2 AS (
          SELECT aw2.dst AS node
          FROM aw2 JOIN ti ON ti.dst = aw2.dst
          WHERE aw2.aw * 3 >= ti.total_w * 1
            AND aw2.dst NOT IN (SELECT node FROM a1)),
        a2 AS (
          SELECT node, activated_round FROM a1
          UNION ALL
          SELECT node, CAST(2 AS BIGINT) FROM n2),
        aw3 AS (
          SELECT e.dst, CAST(sum(e.w) AS BIGINT) AS aw
          FROM e JOIN a2 a ON a.node = e.src GROUP BY 1),
        n3 AS (
          SELECT aw3.dst AS node
          FROM aw3 JOIN ti ON ti.dst = aw3.dst
          WHERE aw3.aw * 3 >= ti.total_w * 1
            AND aw3.dst NOT IN (SELECT node FROM a2)),
        a3 AS (
          SELECT node, activated_round FROM a2
          UNION ALL
          SELECT node, CAST(3 AS BIGINT) FROM n3),
        aw4 AS (
          SELECT e.dst, CAST(sum(e.w) AS BIGINT) AS aw
          FROM e JOIN a3 a ON a.node = e.src GROUP BY 1),
        n4 AS (
          SELECT aw4.dst AS node
          FROM aw4 JOIN ti ON ti.dst = aw4.dst
          WHERE aw4.aw * 3 >= ti.total_w * 1
            AND aw4.dst NOT IN (SELECT node FROM a3)),
        a4 AS (
          SELECT node, activated_round FROM a3
          UNION ALL
          SELECT node, CAST(4 AS BIGINT) FROM n4)
        SELECT node, activated_round FROM a4
        ORDER BY activated_round, node
    """
    from aiwhispr_spark.operators.sharding import ring_positions

    _ring_full = ring_positions(["s1", "s2", "s3", "s4"], 8)
    _ring_wo3 = ring_positions(["s1", "s2", "s4"], 8)
    _rv = lambda ring: ", ".join(f"('{sh}', {pos})" for sh, pos in ring)  # noqa: E731
    o["consistent_hash_ring"] = f"""
        WITH src AS (
          SELECT 'https://h' || (doc_id % 37) || '.example.com/p/' || doc_id
                   AS url
          FROM documents
        ),
        k AS (SELECT url,
                     ('0x' || substr(md5(url), 1, 15))::BIGINT AS h
              FROM src),
        rf(shard, pos) AS (VALUES {_rv(_ring_full)}),
        rw(shard, pos) AS (VALUES {_rv(_ring_wo3)}),
        cf AS (SELECT k.url, arg_min(rf.shard, rf.pos) AS s
               FROM k JOIN rf ON rf.pos >= k.h GROUP BY k.url),
        cw AS (SELECT k.url, arg_min(rw.shard, rw.pos) AS s
               FROM k JOIN rw ON rw.pos >= k.h GROUP BY k.url)
        SELECT k.url,
               coalesce(cf.s, '{_ring_full[0][0]}') AS shard_full,
               coalesce(cw.s, '{_ring_wo3[0][0]}') AS shard_wo_s3,
               CAST(CASE WHEN coalesce(cf.s, '{_ring_full[0][0]}')
                         <> coalesce(cw.s, '{_ring_wo3[0][0]}')
                    THEN 1 ELSE 0 END AS BIGINT) AS moved_i
        FROM k LEFT JOIN cf ON cf.url = k.url LEFT JOIN cw ON cw.url = k.url
    """
    o["knapsack_crawl_budget"] = """
        WITH hosts AS (
          SELECT 'h' || (doc_id % 30) AS key,
                 CAST(sum(n_chars) AS BIGINT) AS value,
                 CAST(count(*) * 3 + min(doc_id % 7) AS BIGINT) AS cost
          FROM documents GROUP BY 1
        ),
        base AS (
          SELECT key, value, cost,
                 CAST(CASE WHEN cost <= 0 THEN -1
                      ELSE greatest(0, (1000000 * value) // cost) END
                      AS BIGINT) AS ratio_i
          FROM hosts
        ),
        cum AS (
          SELECT *,
                 CAST(coalesce(sum(CASE WHEN ratio_i >= 0 THEN cost END)
                   OVER (ORDER BY ratio_i DESC, key
                         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                   0) AS BIGINT) AS cum_prev
          FROM base
        )
        SELECT key, value, cost, ratio_i,
               CAST(CASE WHEN ratio_i < 0 THEN 0
                    ELSE greatest(0, least(cost, 800 - cum_prev)) END
                    AS BIGINT) AS alloc_cost,
               CAST(CASE WHEN cost <= 0
                         OR (CASE WHEN ratio_i < 0 THEN 0
                             ELSE greatest(0, least(cost, 800 - cum_prev)) END) = 0
                    THEN 0
                    ELSE (value * (CASE WHEN ratio_i < 0 THEN 0
                          ELSE greatest(0, least(cost, 800 - cum_prev)) END)
                          * 1000000) // cost END AS BIGINT) AS captured_mi
        FROM cum
    """
    o["politeness_fetch_schedule"] = """
        WITH f AS (
          SELECT 'h' || (doc_id % 5) AS host,
                 'u' || doc_id AS url,
                 CAST(1700000000 + (doc_id * 13) % 900 AS BIGINT) AS arrival_ep
          FROM documents
        ),
        idx AS (
          SELECT host, url, arrival_ep,
                 CAST(row_number() OVER (PARTITION BY host
                        ORDER BY arrival_ep, url) - 1 AS BIGINT) AS q_idx
          FROM f
        ),
        run AS (
          SELECT *,
                 CAST(q_idx * 7 + max(arrival_ep - q_idx * 7) OVER (
                        PARTITION BY host ORDER BY q_idx
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                      AS BIGINT) AS fetch_ep
          FROM idx
        )
        SELECT host, url, arrival_ep, q_idx, fetch_ep,
               CAST(fetch_ep - arrival_ep AS BIGINT) AS wait_s
        FROM run
    """
    o["elias_fano_postings"] = """
        WITH toks AS (
          SELECT doc_id AS id,
                 unnest(regexp_split_to_array(lower(trim(text)), '\\s+')) AS token
          FROM documents
        ),
        post AS (SELECT token, id FROM toks WHERE token <> ''
                 GROUP BY token, id),
        agg AS (
          SELECT token, CAST(count(*) AS BIGINT) AS n_docs,
                 CAST(max(id) AS BIGINT) AS max_id
          FROM post GROUP BY 1
        ),
        sz AS (
          SELECT token, n_docs, max_id,
                 CAST(CASE WHEN (max_id + 1) // n_docs >= 2
                      THEN length(bin((max_id + 1) // n_docs)) - 1
                      ELSE 0 END AS BIGINT) AS low_bits
          FROM agg
        ),
        ef AS (
          SELECT token, n_docs, max_id, low_bits,
                 CAST(n_docs * low_bits + n_docs
                      + (max_id >> CAST(low_bits AS INT)) + 1 AS BIGINT)
                   AS ef_bits,
                 CAST(n_docs * 64 AS BIGINT) AS plain_bits
          FROM sz
        )
        SELECT token, n_docs, max_id, low_bits, ef_bits, plain_bits,
               CAST((plain_bits * 10000) // ef_bits AS BIGINT) AS ratio_i
        FROM ef ORDER BY n_docs DESC, token LIMIT 30
    """
    o["sequential_pattern_support"] = """
        WITH g AS (
          SELECT user_id AS uid, event_type AS etype,
                 min(ts) AS first_ts, max(ts) AS last_ts
          FROM events GROUP BY 1, 2
        ),
        tot AS (SELECT CAST(count(DISTINCT uid) AS BIGINT) AS n_total FROM g),
        pairs AS (
          SELECT x.etype AS antecedent, y.etype AS consequent,
                 CAST(count(*) AS BIGINT) AS n_users
          FROM g x JOIN g y ON x.uid = y.uid AND x.etype <> y.etype
          WHERE x.first_ts < y.last_ts
          GROUP BY 1, 2 HAVING count(*) >= 5
        )
        SELECT antecedent, consequent, n_users,
               CAST((1000000 * n_users) // n_total AS BIGINT) AS support_mi
        FROM pairs, tot
    """
    o["vocabulary_drift_jsd"] = """
        WITH ta AS (
          SELECT unnest(list_filter(
                   regexp_split_to_array(lower(trim(text)), '\\s+'),
                   x -> x <> '')) AS tok
          FROM documents WHERE doc_id % 2 = 0
        ),
        tb AS (
          SELECT unnest(list_filter(
                   regexp_split_to_array(lower(trim(text)), '\\s+'),
                   x -> x <> '')) AS tok
          FROM documents WHERE doc_id % 2 = 1
        ),
        ca AS (SELECT tok, CAST(count(*) AS BIGINT) AS ca FROM ta GROUP BY 1),
        cb AS (SELECT tok, CAST(count(*) AS BIGINT) AS cb FROM tb GROUP BY 1),
        j AS (
          SELECT coalesce(ca.ca, 0) AS ca, coalesce(cb.cb, 0) AS cb
          FROM ca FULL JOIN cb ON ca.tok = cb.tok
        ),
        tot AS (SELECT CAST(sum(ca) AS BIGINT) AS na,
                       CAST(sum(cb) AS BIGINT) AS nb FROM j),
        terms AS (
          SELECT ca, cb, na, nb,
                 CAST(CASE WHEN ca = 0 THEN 0 ELSE ca * CAST(round(1000000 * ln(
                   (2.0 * ca * nb) / (CAST(ca AS DOUBLE) * nb
                                      + CAST(cb AS DOUBLE) * na)
                 )) AS BIGINT) END AS BIGINT) AS t_a,
                 CAST(CASE WHEN cb = 0 THEN 0 ELSE cb * CAST(round(1000000 * ln(
                   (2.0 * cb * na) / (CAST(ca AS DOUBLE) * nb
                                      + CAST(cb AS DOUBLE) * na)
                 )) AS BIGINT) END AS BIGINT) AS t_b
          FROM j, tot
        )
        SELECT CAST(coalesce(max(na), 0) AS BIGINT) AS n_tokens_a,
               CAST(coalesce(max(nb), 0) AS BIGINT) AS n_tokens_b,
               CAST(coalesce(sum(CASE WHEN ca > 0 AND cb > 0 THEN 1 ELSE 0 END),
                    0) AS BIGINT) AS n_shared_types,
               CAST(coalesce(sum(CASE WHEN ca > 0 AND cb = 0 THEN 1 ELSE 0 END),
                    0) AS BIGINT) AS n_only_a,
               CAST(coalesce(sum(CASE WHEN ca = 0 AND cb > 0 THEN 1 ELSE 0 END),
                    0) AS BIGINT) AS n_only_b,
               CAST(CASE WHEN coalesce(max(na), 0) = 0
                         OR coalesce(max(nb), 0) = 0 THEN 0
                    ELSE (sum(t_a) // (2 * max(na)))
                         + (sum(t_b) // (2 * max(nb))) END AS BIGINT) AS jsd_mi
        FROM terms
    """
    o["tpch_q12_late_priority"] = """
        WITH li AS (
          SELECT l_orderkey,
                 list_extract(['MAIL','SHIP','RAIL','TRUCK'],
                              CAST(l_suppkey % 4 AS INT) + 1) AS shipmode,
                 l_shipdate
          FROM lineitem
        )
        SELECT shipmode,
               CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                        THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
               CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                        THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
        FROM li JOIN orders ON l_orderkey = o_orderkey
        WHERE l_shipdate > o_orderdate + INTERVAL 90 DAY
        GROUP BY shipmode ORDER BY shipmode
    """
    o["tpch_q13_order_distribution"] = """
        WITH per AS (
          SELECT c.c_custkey, CAST(count(o.o_orderkey) AS BIGINT) AS c_count
          FROM customer c
          LEFT JOIN (SELECT o_custkey, o_orderkey FROM orders
                     WHERE o_orderpriority <> '5-LOW') o
            ON c.c_custkey = o.o_custkey
          GROUP BY 1
        )
        SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
        FROM per GROUP BY 1 ORDER BY custdist DESC, c_count DESC
    """
    o["tpch_q19_disjunctive_revenue"] = """
        SELECT CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 100)
                        AS BIGINT)) AS BIGINT) AS revenue_ci,
               CAST(count(*) AS BIGINT) AS n_lines
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
               AND l_quantity BETWEEN 1 AND 20)
           OR (p_brand = 'Brand#3' AND p_size BETWEEN 10 AND 30
               AND l_quantity BETWEEN 10 AND 40)
           OR (p_brand = 'Brand#5' AND p_size BETWEEN 20 AND 50
               AND l_quantity BETWEEN 20 AND 50)
    """
    o["tpch_q22_global_sales_opportunity"] = """
        WITH c AS (
          SELECT c_custkey, CAST(c_nationkey % 7 AS BIGINT) AS cntrycode,
                 CAST(round(c_acctbal * 100) AS BIGINT) AS bal_ci
          FROM customer WHERE c_nationkey % 7 IN (1, 2, 4)
        ),
        avg_pos AS (
          SELECT CAST(sum(bal_ci) // count(*) AS BIGINT) AS avg_ci
          FROM c WHERE bal_ci > 0
        )
        SELECT cntrycode,
               CAST(count(*) AS BIGINT) AS numcust,
               CAST(sum(bal_ci) AS BIGINT) AS totacctbal_ci
        FROM c, avg_pos
        WHERE bal_ci > avg_ci
          AND NOT EXISTS (SELECT 1 FROM orders
                          WHERE o_custkey = c.c_custkey
                            AND o_orderdate >= DATE '2001-01-01')
        GROUP BY cntrycode ORDER BY cntrycode
    """
    return o
