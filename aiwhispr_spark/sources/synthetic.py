"""Deterministic Common-Crawl-style web-page corpus (BASELINE.json input_hint).

Schema exactly: (url:string, warc_ts:timestamp, html:binary, text:string, lang:string).
``text`` is NULL at generation time — the engine's E1 extract stage populates it;
the oracle fills its own copy for byte-identity / P/R runs (FIXTURES.md §1).

Content mix exercises every branch of the reference extractor (T1 entity regex,
the semicolon-less ``&lt;code&gt`` alternative, real ``<code>`` blocks for T2/T3,
700-word chunk boundaries for C1, non-English sentences for T5, latin1-roundtrip
chars for T6) plus Zipf-distributed entity mentions in SVO sentences for the KG
stages (triples, skew salting, alias canonicalization).

Everything is seeded (seed=42) and library-free, so any two runs — and the
single-process oracle — see identical bytes.
"""

from __future__ import annotations

import datetime as dt
import random

_WORDS = (
    "the quick brown fox jumps over a lazy dog while many small systems process "
    "large tables of data across wide clusters and narrow pipes with steady "
    "throughput during long nights and short days because every query wants an "
    "answer that arrives fast and correct even when the input grows beyond any "
    "single machine memory and must be split shuffled joined and reduced again"
).split()

_SVO_TEMPLATES = [
    "{s} acquired {o}.",
    "{s} is based in {o}.",
    "{s} was founded by {o}.",
    "{s} works for {o}.",
    "{s} is located in {o}.",
    "{s} owns {o}.",
    "{s} partnered with {o}.",
]

_PLACES = ["Berlin", "Paris", "Tokyo", "Oslo", "Madrid", "Lagos", "Lima", "Delhi"]
_PEOPLE = ["Ada Byron", "Alan Turing", "Grace Hopper", "Edsger Dijkstra"]

_DE_SENT = "Der schnelle braune Fuchs springt über den faulen Hund und die Daten sind groß."
_FR_SENT = "Le renard brun rapide saute sur le chien paresseux et les données sont grandes."
_LATIN1 = "The café naïve résumé costs £9 and the größe is ü."

# doc word-lengths cycle to hit the 700-word bucket-fill boundaries
_LEN_CYCLE = [50, 350, 699, 700, 701, 1400, 2100]

EPOCH0 = dt.datetime(2023, 1, 1, 0, 0, 0)


def _zipf_rank(rng: random.Random, n: int, alpha: float = 1.2) -> int:
    """Deterministic Zipf(alpha) sample in [1, n] by inverse-CDF over a
    precomputed table-free harmonic approximation (good enough for skew)."""
    u = rng.random()
    # Pareto inverse-CDF: k = u^(-1/(alpha-1)) puts heavy mass on small ranks
    u = max(u, 1e-12)
    k = int(u ** (-1.0 / (alpha - 1.0))) if alpha > 1.0 else int(u * n) + 1
    return min(max(k, 1), n)


def entity_name(rank: int, variant: int) -> str:
    """Alias family for entity `rank`: three surface forms that canonicalize
    together (FIXTURES.md: "Entity_7", "Entity 7", "E7 Corp")."""
    forms = [f"Entity_{rank}", f"Entity {rank}", f"E{rank} Corp"]
    return forms[variant % 3]


def make_doc_html(i: int, n_entities: int = 200) -> tuple[str, str]:
    """Deterministic (html, lang) for document `i`."""
    rng = random.Random(42 * 1_000_003 + i)
    lang_slot = i % 20
    if lang_slot < 17:
        lang = "en"
    elif lang_slot == 17:
        lang = "de"
    elif lang_slot == 18:
        lang = "fr"
    else:
        lang = "mixed"

    target_words = _LEN_CYCLE[i % len(_LEN_CYCLE)]
    parts: list[str] = []
    words_emitted = 0
    para_idx = 0
    while words_emitted < target_words:
        para_idx += 1
        n = min(25 + (i + para_idx) % 30, target_words - words_emitted)
        sent_words = [_WORDS[rng.randrange(len(_WORDS))] for _ in range(max(n, 1))]
        sentence = " ".join(sent_words) + "."
        words_emitted += max(n, 1)

        # SVO entity sentences every other paragraph (KG signal)
        if para_idx % 2 == 0:
            s_rank = _zipf_rank(rng, n_entities)
            subj = entity_name(s_rank, rng.randrange(3))
            tmpl = _SVO_TEMPLATES[rng.randrange(len(_SVO_TEMPLATES))]
            if "founded by" in tmpl or "works for" in tmpl:
                obj = _PEOPLE[rng.randrange(len(_PEOPLE))]
            elif "based in" in tmpl or "located in" in tmpl:
                obj = _PLACES[rng.randrange(len(_PLACES))]
            else:
                obj = entity_name(_zipf_rank(rng, n_entities), rng.randrange(3))
            svo = tmpl.format(s=subj, o=obj)
            sentence = sentence + " " + svo
            words_emitted += len(svo.split())

        parts.append("<p>" + sentence + "</p>")

    # entity-regex branch: raw HTML entities in ~every 3rd doc
    if i % 3 == 0:
        parts.append("<p>Fish &amp; chips cost &#65;&#x41; pounds&nbsp;here.</p>")
    # escaped pseudo-tags incl. the semicolon-less &lt;code&gt alternative
    if i % 5 == 0:
        parts.append(
            "<p>escaped &lt;pre&gt; and &lt;/pre&gt; plus &lt;code&gt "
            "and &lt;/code&gt; with p&gt; /p&gt; and &#xA; markers.</p>"
        )
    # real <code> blocks for T2/T3 (~20% of docs, 1-3 blocks, some multi-line)
    if i % 5 == 1:
        n_blocks = 1 + (i // 5) % 3
        for b in range(n_blocks):
            body = f"x = {b}; print(x)" if b % 2 == 0 else f"for k in range({b}):\n  y += k"
            parts.append(f"<code>{body}</code>")
    # latin1-roundtrip characters for the T6 branch
    if i % 7 == 0:
        parts.append("<p>" + _LATIN1 + "</p>")
    # non-English sentences for the per-sentence language filter
    if lang == "de":
        parts.append("<p>" + _DE_SENT + "</p>")
    elif lang == "fr":
        parts.append("<p>" + _FR_SENT + "</p>")
    elif lang == "mixed":
        parts.append("<p>" + _DE_SENT + " " + _FR_SENT + "</p>")

    html = "<html><body>\n" + "\n".join(parts) + "\n</body></html>"
    return html, lang


def make_simple_doc_html(i: int, n_entities: int = 50) -> str:
    """ASCII-only, English-only, sub-700-word document: the SQL-composable
    subset of :func:`make_doc_html`.

    Constraints (each one buys a closed-form DuckDB equivalent of a pipeline
    stage, enabling the end-to-end T1→roundtrip→C1→T5→SVO oracle):
    * pure ASCII → the utf-8↔ISO-8859-1 disk-hop roundtrip is the identity;
    * < 700 words → the C1 bucket-fill chunker takes only whole-line fills and
      emits exactly ONE chunk: ``concat(' ' + rstrip(line) for nonblank line)``;
    * every sentence detects as English (word sentences carry EN stopwords;
      SVO-only sentences have zero stopword evidence → 'en' by the detector's
      empty-evidence rule) → the T5 validator keeps all sentences, reducing to
      deletion of each post-[.!?] whitespace run.
    Still exercised for real: T1 entity/escape stripping (incl. the
    semicolon-less ``&lt;code&gt`` quirk), multi-line fill, alias surface
    variants, Zipf-weighted entity ranks, all 7 SVO templates."""
    rng = random.Random(77 * 1_000_003 + i)
    target_words = 40 + (i % 5) * 30
    parts: list[str] = []
    words_emitted = 0
    para_idx = 0
    while words_emitted < target_words:
        para_idx += 1
        n = min(8 + (i + para_idx) % 10, target_words - words_emitted)
        sent_words = [_WORDS[rng.randrange(len(_WORDS))] for _ in range(max(n, 1))]
        sentence = " ".join(sent_words) + "."
        words_emitted += max(n, 1)
        if para_idx % 2 == 0:
            s_rank = _zipf_rank(rng, n_entities)
            subj = entity_name(s_rank, rng.randrange(3))
            tmpl = _SVO_TEMPLATES[rng.randrange(len(_SVO_TEMPLATES))]
            if "founded by" in tmpl or "works for" in tmpl:
                obj = _PEOPLE[rng.randrange(len(_PEOPLE))]
            elif "based in" in tmpl or "located in" in tmpl:
                obj = _PLACES[rng.randrange(len(_PLACES))]
            else:
                obj = entity_name(_zipf_rank(rng, n_entities), rng.randrange(3))
            svo = tmpl.format(s=subj, o=obj)
            sentence = sentence + " " + svo
            words_emitted += len(svo.split())
        parts.append("<p>" + sentence + "</p>")
    if i % 3 == 0:
        parts.append(
            "<p>Fish &amp; chips cost &#65; pounds&nbsp;here and the "
            "&lt;code&gt marker p&gt; sits in the middle.</p>"
        )
    return "<html><body>\n" + "\n".join(parts) + "\n</body></html>"


def make_linked_doc_html(i: int, n_docs: int = 240, n_hosts: int = 12) -> str:
    """Deterministic hyperlinked page for the link-graph operators
    (operators/linkgraph.py).  Every target is a closed-form function of
    ``i``, so the DuckDB oracle can write each expected canonical out-link
    directly — an independent check of the extract→resolve→canonicalize
    chain rather than a re-implementation of it.

    Per page: three REAL out-links —
    * absolute, with a tracking param (canonicalizer must drop it);
    * root-relative (resolver must join it to the page's own scheme+host);
    * external, uppercase host + explicit :443 + trailing slash (all three
      normalized away);
    and three NON-links the extractor must skip (mailto:, javascript:,
    bare-fragment), plus one doc-relative link ("sub/page") that the
    resolver's documented skip-rule drops."""
    rng = random.Random(9 * 1_000_003 + i)
    sent = " ".join(_WORDS[rng.randrange(len(_WORDS))] for _ in range(12)) + "."
    a1 = (i * 7 + 1) % n_docs
    a2 = (i * 13 + 5) % n_docs
    parts = [
        "<p>" + sent + "</p>",
        f'<p>See <a href="https://host{a1 % n_hosts}.example.org/a/{a1}'
        f'?utm_source=syn&ref=feed">page {a1}</a> for details.</p>',
        f'<p>Also <a class="nav" href="/a/{a2}">local page {a2}</a> here.</p>',
        f'<p>Source: <a href="https://EXT{i % 5}.example.net:443/x/{i % 3}/">'
        "external</a>.</p>",
        '<p><a href="mailto:team@example.org">mail</a> '
        '<a href="javascript:void(0)">js</a> '
        '<a href="#top">top</a> '
        '<a href="sub/page">rel</a></p>',
    ]
    return "<html><body>\n" + "\n".join(parts) + "\n</body></html>"


def write_linked_corpus_parquet(
    path: str, n_docs: int = 240, n_hosts: int = 12
) -> str:
    """Materialize the hyperlinked corpus (same 5-column schema; page i lives
    at https://host{i%n_hosts}.example.org/a/{i})."""
    import pyarrow.parquet as pq

    rows = [
        {
            "url": f"https://host{i % n_hosts}.example.org/a/{i}",
            "warc_ts": EPOCH0 + dt.timedelta(seconds=271 * i),
            "html": make_linked_doc_html(i, n_docs, n_hosts).encode("utf-8"),
            "text": None,
            "lang": "en",
        }
        for i in range(n_docs)
    ]
    pq.write_table(_rows_to_table(rows), path)
    return path


def write_simple_corpus_parquet(path: str, n_docs: int, n_entities: int = 50) -> str:
    """Materialize the oracle-friendly corpus (single parquet file, same
    5-column schema as the main corpus)."""
    import pyarrow.parquet as pq

    rows = [
        {
            "url": f"https://simple{i % 13}.example.org/p/{i}",
            "warc_ts": EPOCH0 + dt.timedelta(seconds=311 * i),
            "html": make_simple_doc_html(i, n_entities).encode("utf-8"),
            "text": None,
            "lang": "en",
        }
        for i in range(n_docs)
    ]
    pq.write_table(_rows_to_table(rows), path)
    return path


def make_structured_doc_html(i: int) -> str:
    """Deterministic page carrying STRUCTURED markup — JSON-LD, OpenGraph /
    meta tags, and a wiki-style infobox table — for the structured-data
    extractors (operators/structured.py).  Every emitted fact is a
    closed-form function of ``i``, so the DuckDB oracle writes the expected
    triples/cards directly from doc-index arithmetic (the
    make_linked_doc_html discipline): an independent check of the whole
    script-block / meta / table extraction chain, not a re-implementation.

    Closed-form facts of page ``i`` (org = Entity{i%37}):
    * title            "Entity{a} overview"; og:title "Entity{a}"
    * og:type          organization / article / profile by i%3
    * description      "Profile of Entity{a} number {i}."
    * JSON-LD          Organization{name, url=https://entity{a}.example.com,
                       founder=Person{(5i+2)%23}, foundingDate=(1970+i%30)-01-01,
                       numberOfEmployees=(7i)%9000+10}; every 4th doc (i%4==3)
                       wraps it in an @graph with a second Person node
                       {name=Person{b}, worksFor=Entity{a}}
    * infobox          Headquarters=City{(3i+1)%11}, Industry=Industry{(9i+4)%7},
                       Founded=1970+i%30

    Hostile arms the extractors must survive:
    * i%2==1: meta tags single-quoted; JSON-LD pretty-printed across lines
    * i%4==1: og:type attribute order swapped (content before property)
    * i%5==2: infobox value wrapped in an <a> tag (inner tags must strip),
      th carries a scope attribute
    * every doc: a text/javascript script with a JSON-looking object, and
      (i%6==0) a classless decoy table — both must be ignored.

    Header-keyed DATA table (operators/structured.py::data_table_triples),
    closed-form with p1=(2i+1)%19, r1=i%5, u1=(11i)%900+5, p2=(4i+3)%19,
    r2=(i+2)%5, u2=(13i)%900+7:
    * row 1: (Widget{p1}, table:region, Region{r1}),
             (Widget{p1}, table:units_sold, u1)
    * row 2: (Gadget{p2}, table:region, Region{r2}) — EMPTY cell when
      i%7==1 (emits nothing); (Gadget{p2}, table:units_sold, u2); plus a
      ragged fourth cell with no header (always dropped)
    * row-2 subject wrapped in <i> tags (inner tags must strip)."""
    a = i % 37
    b = (5 * i + 2) % 23
    c = (3 * i + 1) % 11
    d = (9 * i + 4) % 7
    year = 1970 + i % 30
    emp = (7 * i) % 9000 + 10
    og_type = ("organization", "article", "profile")[i % 3]

    if i % 2 == 1:
        meta = [
            f"<meta property='og:title' content='Entity{a}' />",
            (
                f"<meta content='{og_type}' property='og:type' />"
                if i % 4 == 1
                else f"<meta property='og:type' content='{og_type}' />"
            ),
            f"<meta name='description' content='Profile of Entity{a} number {i}.' />",
        ]
    else:
        meta = [
            f'<meta property="og:title" content="Entity{a}"/>',
            (
                f'<meta content="{og_type}" property="og:type"/>'
                if i % 4 == 1
                else f'<meta property="og:type" content="{og_type}"/>'
            ),
            f'<meta name="description" content="Profile of Entity{a} number {i}."/>',
        ]

    org = (
        '{"@type": "Organization", "name": "Entity%d", '
        '"url": "https://entity%d.example.com", '
        '"founder": {"@type": "Person", "name": "Person%d"}, '
        '"foundingDate": "%d-01-01", "numberOfEmployees": %d}'
    ) % (a, a, b, year, emp)
    if i % 4 == 3:
        person = (
            '{"@type": "Person", "name": "Person%d", "worksFor": "Entity%d"}'
        ) % (b, a)
        ld = '{"@context": "https://schema.org", "@graph": [%s, %s]}' % (org, person)
    else:
        ld = '{"@context": "https://schema.org", ' + org[1:]
    if i % 2 == 1:
        ld = ld.replace(", ", ",\n  ")
    jsonld = f'<script type="application/ld+json">\n{ld}\n</script>'
    decoy_js = '<script type="text/javascript">var x = {"name": "nope"};</script>'

    hq_td = (
        f'<td><a href="/wiki/City{c}">City{c}</a></td>'
        if i % 5 == 2
        else f"<td>City{c}</td>"
    )
    th_open = '<th scope="row">' if i % 5 == 2 else "<th>"
    infobox = (
        '<table class="infobox">\n'
        f"<tr>{th_open}Headquarters</th>{hq_td}</tr>\n"
        f"<tr>{th_open}Industry</th><td>Industry{d}</td></tr>\n"
        f"<tr>{th_open}Founded</th><td>{year}</td></tr>\n"
        "</table>"
    )
    decoy_table = (
        "<table>\n<tr><th>Nope</th><td>skip me</td></tr>\n</table>"
        if i % 6 == 0
        else ""
    )

    p1, r1, u1 = (2 * i + 1) % 19, i % 5, (11 * i) % 900 + 5
    p2, r2, u2 = (4 * i + 3) % 19, (i + 2) % 5, (13 * i) % 900 + 7
    r2_td = "<td></td>" if i % 7 == 1 else f"<td>Region{r2}</td>"
    data_table = (
        '<table id="products">\n'
        "<tr><th>Product</th><th>Region</th><th>Units Sold</th></tr>\n"
        f"<tr><td>Widget{p1}</td><td>Region{r1}</td><td>{u1}</td></tr>\n"
        f"<tr><td><i>Gadget{p2}</i></td>{r2_td}<td>{u2}</td><td>ragged</td></tr>\n"
        "</table>"
    )

    rng = random.Random(31 * 1_000_003 + i)
    sent = " ".join(_WORDS[rng.randrange(len(_WORDS))] for _ in range(14)) + "."
    return (
        "<html><head>\n"
        f"<title>Entity{a} overview</title>\n" + "\n".join(meta) + "\n"
        f"{jsonld}\n{decoy_js}\n"
        "</head><body>\n"
        f"<p>{sent}</p>\n{infobox}\n{decoy_table}\n{data_table}\n"
        "</body></html>"
    )


def write_structured_corpus_parquet(path: str, n_docs: int = 180) -> str:
    """Materialize the structured-markup corpus (same 5-column schema; page i
    lives at https://sd{i%8}.example.org/item/{i})."""
    import pyarrow.parquet as pq

    rows = [
        {
            "url": f"https://sd{i % 8}.example.org/item/{i}",
            "warc_ts": EPOCH0 + dt.timedelta(seconds=193 * i),
            "html": make_structured_doc_html(i).encode("utf-8"),
            "text": None,
            "lang": "en",
        }
        for i in range(n_docs)
    ]
    pq.write_table(_rows_to_table(rows), path)
    return path


def generate_rows(n_docs: int, n_entities: int = 200, start: int = 0):
    """Yield dict rows of the documents table (html as utf-8 bytes) for doc
    indices [start, n_docs).  Generation is deterministic per index, so
    shard writers can materialize disjoint ranges in parallel."""
    for i in range(start, n_docs):
        html, lang = make_doc_html(i, n_entities)
        yield {
            "url": f"https://site{i % 97}.example.org/page/{i}",
            "warc_ts": EPOCH0 + dt.timedelta(seconds=137 * i),
            "html": html.encode("utf-8"),
            "text": None,
            "lang": lang,
        }


def _rows_to_table(rows):
    import pyarrow as pa

    return pa.table(
        {
            "url": pa.array([r["url"] for r in rows], pa.string()),
            "warc_ts": pa.array([r["warc_ts"] for r in rows], pa.timestamp("us")),
            "html": pa.array([r["html"] for r in rows], pa.binary()),
            "text": pa.array([r["text"] for r in rows], pa.string()),
            "lang": pa.array([r["lang"] for r in rows], pa.string()),
        }
    )


def write_corpus_parquet(
    path: str, n_docs: int, n_entities: int = 200, n_files: int | None = None
) -> str:
    """Materialize the corpus via pyarrow (driver-side: generation is test
    fixture work — the engine itself only ever reads).

    Large corpora are written as a DIRECTORY of many parquet files so the
    Spark scan has natural split parallelism (a single-row-group file caps the
    read at 1 task no matter the cluster size — the local stand-in for how a
    real Iceberg table arrives in many data files)."""
    import os

    import pyarrow.parquet as pq

    if n_files is None:
        n_files = 1 if n_docs < 4000 else 64
    rows = list(generate_rows(n_docs, n_entities))
    if n_files == 1:
        pq.write_table(_rows_to_table(rows), path)
        return path
    os.makedirs(path, exist_ok=True)
    per = (len(rows) + n_files - 1) // n_files
    for i in range(n_files):
        part = rows[i * per : (i + 1) * per]
        if not part:
            break
        pq.write_table(_rows_to_table(part), os.path.join(path, f"part-{i:05d}.parquet"))
    return path


def write_unicode_corpus_parquet(path: str, n_docs: int = 200) -> str:
    """Deterministic mixed-normalization corpus for the unicodenorm gate:
    (doc_id BIGINT, text VARCHAR).  Every doc mixes forms from doc-index
    arithmetic — i%5==0 decomposed accents (e + U+0301), i%5==1 precomposed
    (NFC fixed point), i%5==2 Hangul jamo (compose under NFC), i%5==3
    compatibility chars (ligature/fullwidth — NFC fixed point, NFKC not),
    i%5==4 plain ASCII."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    def make_text(i: int) -> str:
        k = i % 5
        if k == 0:  # decomposed: base letter + combining acute U+0301
            return f"doc {i} cafe\u0301 re\u0301sume\u0301 over {i * 3}"
        if k == 1:  # precomposed U+00E9 (NFC fixed point)
            return f"doc {i} caf\u00e9 r\u00e9sum\u00e9 over {i * 3}"
        if k == 2:  # Hangul jamo U+1112 U+1161 U+11AB -> one syllable in NFC
            return f"doc {i} \u1112\u1161\u11ab\uad6d words"
        if k == 3:  # compatibility chars (NFC fixed point; NFKC would change)
            return f"doc {i} \ufb01ne \uff21\uff22\uff23 half\u00bd"
        return f"doc {i} plain ascii body {i * 7}"

    tbl = pa.table(
        {
            "doc_id": pa.array(range(n_docs), pa.int64()),
            "text": pa.array([make_text(i) for i in range(n_docs)], pa.string()),
        }
    )
    pq.write_table(tbl, path)
    return path


def write_robots_corpus(dir_path: str, n_hosts: int = 12, n_urls_per_host: int = 8) -> str:
    """Deterministic robots.txt compliance fixture: ``robots.parquet``
    (host, robots_txt) + ``urls.parquet`` (url).  Host arms from index
    arithmetic — i%4==0 allow-overrides-disallow + comments + empty rule;
    i%4==1 specific-agent group shadowing '*'; i%4==2 merged consecutive-UA
    group with an equal-length Allow/Disallow tie; i%4==3 trailing EMPTY
    specific group at EOF (RFC 9309: claims the agent, allows all)."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    os.makedirs(dir_path, exist_ok=True)

    def robots_for(i: int) -> str:
        k = i % 4
        if k == 0:
            return (
                "User-agent: *\nDisallow: /private/\nAllow: /private/ok\n"
                "# full-line comment\nDisallow:\nDisallow: /wild*card\n"
            )
        if k == 1:
            return (
                "User-agent: aiwhisprbot\nDisallow: /bot/\n\n"
                "User-agent: *\nDisallow: /all/\n"
            )
        if k == 2:
            return (
                "User-agent: *\nUser-agent: aiwhisprbot\n"
                "Disallow: /shared/\nAllow: /shared/\nDISALLOW: /upper/ # inline\n"
            )
        return "User-agent: *\nDisallow: /\nUser-agent: aiwhisprbot\n"

    hosts = [f"h{i}.example.org" for i in range(n_hosts)]
    pq.write_table(
        pa.table(
            {
                "host": pa.array(hosts, pa.string()),
                "robots_txt": pa.array(
                    [robots_for(i) for i in range(n_hosts)], pa.string()
                ),
            }
        ),
        os.path.join(dir_path, "robots.parquet"),
    )

    paths = [
        "/private/secret",
        "/private/okpage",
        "/pub",
        "/bot/x",
        "/all/y",
        "/shared/z",
        "/upper/q",
        "/",
    ]
    urls = [
        f"https://h{i}.example.org{paths[j % len(paths)]}"
        + ("" if paths[j % len(paths)] == "/" else str(j))
        for i in range(n_hosts)
        for j in range(n_urls_per_host)
    ]
    pq.write_table(
        pa.table({"url": pa.array(sorted(set(urls)), pa.string())}),
        os.path.join(dir_path, "urls.parquet"),
    )
    return dir_path


def write_sitemap_corpus(dir_path: str, n_hosts: int = 8, n_urls: int = 10) -> str:
    """Deterministic sitemap-discovery fixture: ``sitemaps.parquet``
    (host, sitemap_xml) + ``crawlstate.parquet`` (url, last_crawl_day).
    Entry arithmetic: url j of host i has lastmod 2024-01-(1+(i*3+j)%28)
    unless j%3==2 (no lastmod); j%7==5 ships a full W3C datetime (the ISO
    day prefix must be extracted); one block per host has no <loc> (must be
    dropped).  Crawl state covers j%2==0 at 2024-01-15."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    os.makedirs(dir_path, exist_ok=True)

    def sitemap_for(i: int) -> str:
        parts = ['<?xml version="1.0"?>\n<urlset>\n']
        for j in range(n_urls):
            url = f"https://s{i}.example.org/page/{j}"
            day = f"2024-01-{1 + (i * 3 + j) % 28:02d}"
            parts.append("  <url>\n")
            parts.append(f"    <loc> {url} </loc>\n")
            if j % 7 == 5:
                parts.append(f"    <lastmod>{day}T10:30:00+00:00</lastmod>\n")
            elif j % 3 != 2:
                parts.append(f"    <lastmod>\n      {day}\n    </lastmod>\n")
            parts.append("  </url>\n")
        parts.append("  <url>\n    <lastmod>2024-01-02</lastmod>\n  </url>\n")
        parts.append("</urlset>\n")
        return "".join(parts)

    pq.write_table(
        pa.table(
            {
                "host": pa.array(
                    [f"s{i}.example.org" for i in range(n_hosts)], pa.string()
                ),
                "sitemap_xml": pa.array(
                    [sitemap_for(i) for i in range(n_hosts)], pa.string()
                ),
            }
        ),
        os.path.join(dir_path, "sitemaps.parquet"),
    )
    crawled = [
        f"https://s{i}.example.org/page/{j}"
        for i in range(n_hosts)
        for j in range(n_urls)
        if j % 2 == 0
    ]
    pq.write_table(
        pa.table(
            {
                "url": pa.array(crawled, pa.string()),
                "last_crawl_day": pa.array(
                    ["2024-01-15"] * len(crawled), pa.string()
                ),
            }
        ),
        os.path.join(dir_path, "crawlstate.parquet"),
    )
    return dir_path


def write_script_corpus_parquet(path: str, n_docs: int = 120) -> str:
    """(doc_id, text) fixture for textstats.script_profile: each doc mixes
    Latin words with Cyrillic / Greek / Arabic / CJK runs whose LENGTHS are
    closed-form in i, so the DuckDB oracle asserts the per-script counts
    from arithmetic alone (chr()-both-sides discipline, see
    charset_detect_decode):

    * n_latin    = 4·(2 + i%4)   ("word" ×(2+i%4))
    * n_cyrillic = (3i)%7        (chr(0x0410 + i%32) repeated)
    * n_greek    = (7i)%4        (chr(0x03B1 + i%24))
    * n_arabic   = i%5           (chr(0x0627 + i%10))
    * n_cjk      = (5i)%6        (chr(0x4E00 + i%100))
    """
    import pyarrow as pa
    import pyarrow.parquet as pq

    rows = []
    for i in range(n_docs):
        parts = ["word"] * (2 + i % 4)
        parts.append(chr(0x0410 + i % 32) * ((3 * i) % 7))
        parts.append(chr(0x03B1 + i % 24) * ((7 * i) % 4))
        parts.append(chr(0x0627 + i % 10) * (i % 5))
        parts.append(chr(0x4E00 + i % 100) * ((5 * i) % 6))
        rows.append({"doc_id": i, "text": " ".join(p for p in parts if p)})
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([r["doc_id"] for r in rows], pa.int64()),
                "text": pa.array([r["text"] for r in rows], pa.string()),
            }
        ),
        path,
    )
    return path


def write_feed_corpus_parquet(path: str, n_hosts: int = 10) -> str:
    """(host, feed_xml) fixture for sources/feeds.py: even hosts serve RSS
    2.0, odd hosts Atom.  Every advertised entry is a closed-form function
    of (h, j) so the DuckDB oracle writes the expected rows from range()
    arithmetic:

    * host        feed{h}.example.org; 4 + h%3 linked entries (j = 0..)
    * link        https://feed{h}.example.org/post/{h*10+j}
    * title       'Post {h*10+j}', CDATA-wrapped with ' & more' when j%3==2
    * pub_day     2026-{1+(h+j)%12:02d}-{1+(h*7+j)%28:02d}
                  (RSS: RFC-822 pubDate text; Atom: <updated> ISO)

    Hostile arms: one linkless entry per feed (dropped); Atom entries carry
    a rel="self" link BEFORE the alternate one (must be skipped) and the
    feed has a top-level rel="self" link outside any entry; RSS items carry
    <description> noise and single-digit RFC-822 days."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    rows = []
    for h in range(n_hosts):
        host = f"feed{h}.example.org"
        entries = []
        for j in range(4 + h % 3):
            pid = h * 10 + j
            title = f"Post {pid} & more" if j % 3 == 2 else f"Post {pid}"
            title_xml = (
                f"<![CDATA[{title}]]>" if j % 3 == 2 else title
            )
            mm = 1 + (h + j) % 12
            dd = 1 + (h * 7 + j) % 28
            link = f"https://{host}/post/{pid}"
            if h % 2 == 1:
                entries.append(
                    "<entry>\n"
                    f'  <link rel="self" href="https://{host}/entry/{pid}/self"/>\n'
                    f'  <link href="{link}"/>\n'
                    f"  <title>{title_xml}</title>\n"
                    f"  <updated>2026-{mm:02d}-{dd:02d}T10:30:00Z</updated>\n"
                    "</entry>"
                )
            else:
                entries.append(
                    "<item>\n"
                    f"  <title>{title_xml}</title>\n"
                    f"  <link>{link}</link>\n"
                    f"  <description>noise {pid}</description>\n"
                    f"  <pubDate>Mon, {dd} {_RFC_MONTHS[mm - 1]} 2026 "
                    "10:30:00 GMT</pubDate>\n"
                    "</item>"
                )
        if h % 2 == 1:
            entries.append(
                "<entry>\n  <title>linkless</title>\n"
                "  <updated>2026-01-01T00:00:00Z</updated>\n</entry>"
            )
            xml = (
                '<?xml version="1.0"?>\n<feed xmlns="http://www.w3.org/2005/Atom">\n'
                f"<title>{host}</title>\n"
                f'<link rel="self" href="https://{host}/feed.xml"/>\n'
                + "\n".join(entries)
                + "\n</feed>"
            )
        else:
            entries.append(
                "<item>\n  <title>linkless</title>\n"
                "  <description>no link here</description>\n</item>"
            )
            xml = (
                '<?xml version="1.0"?>\n<rss version="2.0"><channel>\n'
                f"<title>{host}</title>\n"
                + "\n".join(entries)
                + "\n</channel></rss>"
            )
        rows.append({"host": host, "feed_xml": xml})
    pq.write_table(
        pa.table(
            {
                "host": pa.array([r["host"] for r in rows], pa.string()),
                "feed_xml": pa.array([r["feed_xml"] for r in rows], pa.string()),
            }
        ),
        path,
    )
    return path


# the RFC-822 month table IS the parser's (fixture and parser must agree by
# contract — one copy, sources/feeds.py)
from .feeds import _MONTHS as _RFC_MONTHS  # noqa: E402


def write_cdx_fixture(path: str, n_records: int = 240) -> str:
    """Deterministic CDX-JSON index shard: record i captures
    https://{www. if i%6==0}h{i%9}.example.org/P{i//3} (uppercase path — SURT
    must lower it) at a unique 14-digit timestamp; every 3 consecutive
    records share a content digest (dedup arm); i%7==3 is a 404, i%5==4 a
    PDF; plus one malformed line and one bad-JSON line."""
    import hashlib
    import json

    def surt_of(host: str, p: str) -> str:
        return ",".join(reversed(host.split("."))) + ")" + p.lower()

    lines = []
    for i in range(n_records):
        host = ("www." if i % 6 == 0 else "") + f"h{i % 9}.example.org"
        p = f"/Page/{i // 3}"
        url = f"https://{host}{p}"
        ts = f"20240101{i // 3600:02d}{(i // 60) % 60:02d}{i % 60:02d}"
        rec = {
            "url": url,
            "mime": "application/pdf" if i % 5 == 4 else "text/html",
            "status": "404" if i % 7 == 3 else "200",
            "digest": "sha1:" + hashlib.md5(str(i // 3).encode()).hexdigest()[:16],
            "length": str(1000 + i * 13),
            "offset": str(i * 2048),
            "filename": f"crawl/seg{i % 4}.warc.gz",
        }
        lines.append(f"{surt_of(host, p)} {ts} {json.dumps(rec)}")
    lines.append("malformed line with no json")
    lines.append('com,broken)/x 20240101000000 {"url": not-json}')
    with open(path, "w", encoding="utf-8") as f:
        f.write("\n".join(lines) + "\n")
    return path


def write_wav_corpus_parquet(path: str, n_clips: int = 60) -> str:
    """Deterministic PCM WAV corpus for the audio-feature gate: clip i is a
    square wave with half-period h=2+i%5 frames, B=20+i%7 blocks (so
    n_frames=h·B, zero crossings exactly B−1), amplitude a=500+25·i (sum of
    squares exactly n·a²), rate 8000·(1+i%3), 1+i%2 channels.  Clip 7 gets a
    LIST chunk (odd-sized, word-aligned) spliced before data to exercise
    chunk walking; one extra record is deliberately corrupt."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from aiwhispr_spark.operators.multimodal import encode_wav

    ids, payloads = [], []
    for i in range(n_clips):
        h, blocks = 2 + i % 5, 20 + i % 7
        n, a = h * blocks, 500 + 25 * i
        rate = 8000 * (1 + i % 3)
        ch0 = np.where((np.arange(n) // h) % 2 == 0, a, -a).astype(np.int16)
        if i % 2 == 1:
            samples = np.stack([ch0, (ch0 // 2).astype(np.int16)], axis=1)
        else:
            samples = ch0[:, None]
        wav = encode_wav(samples, rate)
        if i == 7:  # splice an odd-sized LIST chunk between header and fmt
            extra = b"LIST" + (5).to_bytes(4, "little") + b"INFOx" + b"\x00"
            wav = wav[:12] + extra + wav[12:]
            wav = wav[:4] + (len(wav) - 8).to_bytes(4, "little") + wav[8:]
        ids.append(f"wav{i}")
        payloads.append(wav)
    ids.append("bad0")
    payloads.append(b"not a wav at all")
    pq.write_table(
        pa.table(
            {
                "media_id": pa.array(ids, pa.string()),
                "payload": pa.array(payloads, pa.binary()),
            }
        ),
        path,
    )
    return path


def write_charset_corpus_parquet(path: str, n_docs: int = 120) -> str:
    """Deterministic mixed-encoding web-bytes fixture: doc i carries
    body = 'charset doc {i} na<ï>ve caf<é> r<é>sum<é> {3i}' (accents via
    chr() so source encoding can't drift) in arm i%4 — 0 meta-declared
    utf-8, 1 utf-8 BOM, 2 meta-declared windows-1252 (cp1252 bytes),
    3 utf-16le with BOM."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    i_e, e_a = chr(239), chr(233)  # ï, é

    ids, payloads = [], []
    for i in range(n_docs):
        body = f"charset doc {i} na{i_e}ve caf{e_a} r{e_a}sum{e_a} {i * 3}"
        k = i % 4
        if k == 0:
            payload = (f'<meta charset="utf-8"><p>{body}').encode("utf-8")
        elif k == 1:
            payload = b"\xef\xbb\xbf" + f"<p>{body}".encode("utf-8")
        elif k == 2:
            payload = (
                '<meta http-equiv="Content-Type" content="text/html;'
                f' charset=windows-1252"><p>{body}'
            ).encode("cp1252")
        else:
            payload = f"<p>{body}".encode("utf-16")  # LE BOM prepended
        ids.append(i)
        payloads.append(payload)
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "payload": pa.array(payloads, pa.binary()),
            }
        ),
        path,
    )
    return path


def write_bmp_corpus_parquet(path: str, n_images: int = 24) -> str:
    """(media_id, payload) fixture of REAL 24bpp BMPs whose pixels are
    closed-form in (i, x, y) so the DuckDB oracle derives every channel
    sum from range() arithmetic alone:

    * width  = 4 + i%5, height = 3 + i%4  (width 5 ⇒ stride padding live)
    * R(x,y) = (3x + 5y + i) % 256
    * G(x,y) = (7x + 11y + 2i) % 256
    * B(x,y) = (13x + 17y + 3i) % 256
    """
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from aiwhispr_spark.operators.multimodal import encode_bmp

    ids, payloads = [], []
    for i in range(n_images):
        w, h = 4 + i % 5, 3 + i % 4
        x = np.arange(w)[None, :, None]
        y = np.arange(h)[:, None, None]
        img = np.concatenate(
            [
                (3 * x + 5 * y + i) % 256,
                (7 * x + 11 * y + 2 * i) % 256,
                (13 * x + 17 * y + 3 * i) % 256,
            ],
            axis=2,
        ).astype(np.uint8)
        ids.append(f"img{i}")
        payloads.append(encode_bmp(img))
    pq.write_table(
        pa.table(
            {
                "media_id": pa.array(ids, pa.string()),
                "payload": pa.array(payloads, pa.binary()),
            }
        ),
        path,
    )
    return path


def write_tracker_corpus_parquet(path: str, n_pages: int = 60) -> str:
    """(url, html) fixture for the tracker-script signal: page i on host
    site{i%6}.example.org carries

    * 1 inline script (no src — counts as a script, never as external)
    * i%3 first-party scripts   src="/js/app{k}.js" (relative ⇒ same-origin)
    * i%4 third-party cdn       src="https://cdn{k}.shared.example/lib.js"
    * i%2 + 2·[i%5==0] trackers src="https://{name}.trk{k}.example/t.js",
      name cycling (analytics, pixel, tracker, ads)
    plus anchor/noise markup the script regex must not trip on."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    names = ["analytics", "pixel", "tracker", "ads"]
    urls, htmls = [], []
    for i in range(n_pages):
        host = f"site{i % 6}.example.org"
        parts = [
            f"<html><head><title>Page {i}</title>",
            '<script type="text/javascript">var i = %d;</script>' % i,
        ]
        for k in range(i % 3):
            parts.append(f'<script src="/js/app{k}.js"></script>')
        for k in range(i % 4):
            parts.append(f'<script async src="https://cdn{k}.shared.example/lib.js"></script>')
        for k in range(i % 2 + (2 if i % 5 == 0 else 0)):
            nm = names[(i + k) % 4]
            parts.append(f'<script src="https://{nm}.trk{k}.example/t.js" defer></script>')
        parts.append(f'<body><a href="https://site{(i + 1) % 6}.example.org/p">next</a>')
        parts.append("<p>script is a word, not a tag; &lt;script&gt; is entity-escaped.</p></body></html>")
        urls.append(f"https://{host}/page/{i}")
        htmls.append("\n".join(parts))
    pq.write_table(
        pa.table(
            {
                "url": pa.array(urls, pa.string()),
                "html": pa.array(htmls, pa.string()),
            }
        ),
        path,
    )
    return path


def write_tiff_corpus_parquet(path: str, n_images: int = 24) -> str:
    """(media_id, payload) fixture of REAL baseline multi-strip TIFFs whose
    pixels are closed-form in (i, x, y) so the DuckDB oracle derives every
    channel sum from range() arithmetic alone:

    * width = 5 + i%4, height = 6 + i%5  (heights 6-10 with
      rows_per_strip=4 ⇒ 2-3 strips, the reassembly path always live)
    * R(x,y) = (2x + 9y + i) % 256
    * G(x,y) = (5x + 3y + 2i) % 256
    * B(x,y) = (11x + 7y + 5i) % 256
    """
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from aiwhispr_spark.operators.multimodal import encode_tiff

    ids, payloads = [], []
    for i in range(n_images):
        w, h = 5 + i % 4, 6 + i % 5
        x = np.arange(w)[None, :, None]
        y = np.arange(h)[:, None, None]
        img = np.concatenate(
            [
                (2 * x + 9 * y + i) % 256,
                (5 * x + 3 * y + 2 * i) % 256,
                (11 * x + 7 * y + 5 * i) % 256,
            ],
            axis=2,
        ).astype(np.uint8)
        ids.append(f"img{i}")
        payloads.append(encode_tiff(img, rows_per_strip=4))
    pq.write_table(
        pa.table(
            {
                "media_id": pa.array(ids, pa.string()),
                "payload": pa.array(payloads, pa.binary()),
            }
        ),
        path,
    )
    return path


def write_png_corpus_parquet(path: str, n_images: int = 24) -> str:
    """(media_id, payload) fixture of REAL PNGs (8-bit RGB, per-row filter
    type (y + i) % 5 so all five filters appear in every image position,
    multi-IDAT zlib stream) whose pixels are closed-form in (i, x, y):

    * width = 5 + i%4, height = 6 + i%5
    * R(x,y) = (3x + 8y + 2i) % 256
    * G(x,y) = (7x + 5y + 3i) % 256
    * B(x,y) = (x + 13y + 7i) % 256
    """
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from aiwhispr_spark.operators.multimodal import encode_png

    ids, payloads = [], []
    for i in range(n_images):
        w, h = 5 + i % 4, 6 + i % 5
        x = np.arange(w)[None, :, None]
        y = np.arange(h)[:, None, None]
        img = np.concatenate(
            [
                (3 * x + 8 * y + 2 * i) % 256,
                (7 * x + 5 * y + 3 * i) % 256,
                (x + 13 * y + 7 * i) % 256,
            ],
            axis=2,
        ).astype(np.uint8)
        ids.append(f"img{i}")
        payloads.append(encode_png(img, filter_of_row=lambda r, k=i: (r + k) % 5))
    pq.write_table(
        pa.table(
            {
                "media_id": pa.array(ids, pa.string()),
                "payload": pa.array(payloads, pa.binary()),
            }
        ),
        path,
    )
    return path


def write_gif_corpus_parquet(path: str, n_images: int = 24) -> str:
    """(media_id, payload) fixture of REAL single-frame GIFs (true LZW
    stream, comment extension, odd i interlaced) with a closed-form
    16-color palette and index map so the DuckDB oracle derives channel
    sums from range() arithmetic alone:

    * width = 5 + i%4, height = 6 + i%5
    * idx(x,y) = (x + 2y + i) % 16
    * palette[k] = ((7k+3)%256, (11k+5)%256, (13k+9)%256)
    """
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from aiwhispr_spark.operators.multimodal import encode_gif

    pal = np.stack(
        [
            (7 * np.arange(16) + 3) % 256,
            (11 * np.arange(16) + 5) % 256,
            (13 * np.arange(16) + 9) % 256,
        ],
        axis=1,
    ).astype(np.uint8)
    ids, payloads = [], []
    for i in range(n_images):
        w, h = 5 + i % 4, 6 + i % 5
        x = np.arange(w)[None, :]
        y = np.arange(h)[:, None]
        idx = ((x + 2 * y + i) % 16).astype(np.uint8)
        ids.append(f"img{i}")
        payloads.append(encode_gif(idx, pal, interlace=bool(i % 2)))
    pq.write_table(
        pa.table(
            {
                "media_id": pa.array(ids, pa.string()),
                "payload": pa.array(payloads, pa.binary()),
            }
        ),
        path,
    )
    return path
