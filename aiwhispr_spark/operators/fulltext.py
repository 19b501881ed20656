"""Q4: full-text search as an inverted-index dataflow.

The reference's text-search arm (postgres: generated ``tsvector`` column + GIN
index, ``websearch_to_tsquery`` predicate, ``ts_rank`` ordering, LIMIT k —
postgresVectorDb.py:248,268,479,490-493; typesense ``_text_match:desc``
typesenseVectorDb.py:229-233) relies on an engine-side index.  Spark has no
secondary indexes, so the idiomatic recast is the index AS a table:

* ``build_inverted_index`` materializes (token, doc_id, tf) posting lists —
  one shuffle on token; at 100 TB this table is written bucketed by token so
  repeated searches join without re-shuffling the corpus.
* ``search_terms`` is then a broadcast join of the (tiny) query-term set
  against the postings, a partial-agg sum per doc, and a TakeOrderedAndProject
  top-k — the corpus itself is never rescanned or reshuffled.

Scoring is term-frequency sum (``any`` mode) with an all-terms-required
``all`` mode (the reference's websearch AND semantics); ts_rank's length
normalization is intentionally not replicated (engine-specific constant).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def tokenize(col) -> "F.Column":
    """Whitespace tokens of lowercased text — shared by index and query side."""
    return F.split(F.lower(F.trim(col)), r"\s+")


def build_inverted_index(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(token, id, tf) posting-list table."""
    return (
        df.select(F.col(id_col).alias("id"), F.explode(tokenize(F.col(text_col))).alias("token"))
        .filter(F.col("token") != "")
        .groupBy("token", "id")
        .agg(F.count(F.lit(1)).alias("tf"))
    )


def search_terms(
    index: DataFrame,
    terms: Sequence[str],
    k: int = 20,
    mode: str = "any",
) -> DataFrame:
    """Top-k (id, score, n_terms) over a posting-list table.  score = Σ tf of
    matched query terms; ``all`` mode keeps only docs matching every term.
    Deterministic order: score desc, id asc."""
    # dedupe up front: a repeated query term must not double-count tf in score
    terms = sorted({t.lower() for t in terms})
    spark = index.sparkSession
    q = spark.createDataFrame([(t,) for t in terms], "token string")
    scored = (
        index.join(F.broadcast(q), "token")
        .groupBy("id")
        .agg(
            F.sum("tf").cast("long").alias("score"),
            F.countDistinct("token").cast("int").alias("n_terms"),
        )
    )
    if mode == "all":
        scored = scored.filter(F.col("n_terms") == len(terms))
    elif mode != "any":
        raise ValueError(f"unknown search mode: {mode}")
    return scored.orderBy(F.col("score").desc(), F.col("id")).limit(k)


def search_fields_weighted(
    df: DataFrame,
    terms: Sequence[str],
    fields: dict[str, float],
    id_col: str = "doc_id",
    k: int = 20,
) -> DataFrame:
    """Multi-field weighted full-text rank — typesense's ``query_by:
    text_chunk, content_path, title`` semantics (reference
    typesenseVectorDb.py:229-233: several fields queried at once, a hit in a
    higher-weighted field outranking a body hit).

    score_i = round(1e4 · Σ_field weight_f · tf_f(matched terms)) — the
    scaled-int float discipline, so cross-engine ordering is exact.

    Scale shape: ONE scan and ONE explode chain — the per-field token streams
    are built as an array of (field, weight, tokens) structs and exploded
    in-row, NOT as a K-way union of the corpus (a union re-scans the input
    per field and multiplies map-side partitions — the r2 fan-out lesson).
    The tiny term set broadcasts; the only shuffle is the partial-agg sum per
    doc; top-k compiles to TakeOrderedAndProject."""
    terms = sorted({t.lower() for t in terms})
    spark = df.sparkSession
    q = spark.createDataFrame([(t,) for t in terms], "token string")
    fw = F.array(
        *[
            F.struct(
                F.lit(f).alias("field"),
                F.lit(float(w)).alias("weight"),
                tokenize(F.col(f)).alias("toks"),
            )
            for f, w in sorted(fields.items())
        ]
    )
    postings = (
        df.select(F.col(id_col).alias("id"), F.explode(fw).alias("fw"))
        .select("id", "fw.field", "fw.weight", F.explode("fw.toks").alias("token"))
        .filter(F.col("token") != "")
    )
    scored = (
        postings.join(F.broadcast(q), "token")
        .groupBy("id")
        .agg(
            F.round(F.sum("weight") * 10000).cast("long").alias("score_i"),
            F.countDistinct("token").cast("int").alias("n_terms"),
            F.countDistinct("field").cast("int").alias("n_fields"),
        )
    )
    return scored.orderBy(F.col("score_i").desc(), F.col("id")).limit(k)


def write_bucketed_postings(
    index: DataFrame, table_name: str, path: str, n_buckets: int = 64
) -> None:
    """Persist the posting-list table BUCKETED (and sorted) by token — the
    'index as a table' scale story: after this one-time write, every
    token-keyed operation (vocabulary distinct for fuzzy matching, postings
    re-aggregation, an SMJ against a non-broadcastable term set) reads
    pre-clustered buckets and needs NO exchange of the postings
    (plan-asserted in tests/test_plans.py).  Locally this registers in the
    in-memory session catalog with an external path; on a cluster the same
    write targets a Hive/Iceberg catalog (Iceberg: ``bucket(n_buckets,
    token)`` partition transform)."""
    (
        index.write.mode("overwrite")
        .bucketBy(n_buckets, "token")
        .sortBy("token")
        .option("path", path)
        .saveAsTable(table_name)
    )


def _fuzzy_vocab_match(vocab: DataFrame, terms: Sequence[str], max_edits: int) -> DataFrame:
    """Candidate (term, token, …) pairs: broadcast-nested-loop of the tiny
    term list against a token VOCABULARY frame with the |lenΔ| <= max_edits
    necessary-condition prefilter before the O(n·m) levenshtein — the one
    shared fuzzy-matching kernel behind search_terms_fuzzy and
    spell_correct_terms (fix the matching semantics HERE, once)."""
    uniq = sorted({t.lower() for t in terms})
    spark = vocab.sparkSession
    q = spark.createDataFrame([(t,) for t in uniq], "term string")
    return vocab.join(
        F.broadcast(q),
        (F.abs(F.length("token") - F.length("term")) <= max_edits)
        & (F.levenshtein("token", "term") <= max_edits),
    )


def search_terms_fuzzy(
    index: DataFrame,
    terms: Sequence[str],
    k: int = 20,
    max_edits: int = 2,
) -> DataFrame:
    """Fuzzy full-text search: a posting matches a query term when
    ``levenshtein(token, term) <= max_edits`` — the mongo connector's
    ``$search`` fuzzy semantics (reference mongodbVectorDb.py:275-295,
    fuzzy maxEdits=2).

    Scale shape: the edit-distance match runs against the DISTINCT TOKEN
    VOCABULARY (orders smaller than the postings table), as a broadcast
    nested-loop of the tiny term list against the vocabulary with a length
    prefilter (|len(token)-len(term)| <= max_edits — a necessary condition
    for edit distance, pruning most of the vocabulary before the O(n*m)
    levenshtein evaluates).  The matched-token set then equi-joins back into
    the postings — the corpus-sized table never sees a non-equi join.

    score = Σ tf over matched (term, token) pairs (a token within edit
    distance of two query terms counts twice, once per term);
    n_terms = #query terms matched.  Deterministic order: score desc, id."""
    matched = _fuzzy_vocab_match(index.select("token").distinct(), terms, max_edits)
    scored = (
        index.join(matched, "token")
        .groupBy("id")
        .agg(
            F.sum("tf").cast("long").alias("score"),
            F.countDistinct("term").cast("int").alias("n_terms"),
        )
    )
    return scored.orderBy(F.col("score").desc(), F.col("id")).limit(k)


def hybrid_search(
    documents: DataFrame,
    embeddings: DataFrame,
    terms: Sequence[str],
    query_vector: list[float],
    k_semantic: int = 25,
    k_text: int = 20,
    doc_id_col: str = "doc_id",
    vec_id_col: str = "vec_id",
    text_col: str = "text",
    vec_col: str = "embedding",
) -> DataFrame:
    """Combined text + vector search in ONE call — the reference's
    ``withtextsearch=Y`` response carries BOTH result classes plus their found
    counts (searchService.py:73-97 builds the two-armed response;
    typesenseVectorDb.py:214-253 issues one multi_search with a vector query
    and a text query, :255-282 shapes the two result sets).

    Returns (result_type, id, score_i, rank, found):
      * result_type 'semantic' — top ``k_semantic`` by cosine vs
        ``query_vector``; score_i = round(cosine × 1e4) (scaled-int float
        discipline so cross-engine order is exact);
      * result_type 'text'     — top ``k_text`` by tf-sum over ``terms``;
        score_i = tf_sum × 1e4 (same scale, integer-exact);
      * found — the arm's candidate count before top-k (typesense 'found').

    Physical shape: each arm is the already-optimal single-arm plan (top-k →
    TakeOrderedAndProject; term match → broadcast join + partial agg); the
    found counts are 1-row aggregates broadcast onto the ≤(k_sem+k_text)-row
    result — nothing reshuffles the corpus."""
    from ..functions.udfs import cosine_expr

    from pyspark.sql.window import Window

    sem_scored = embeddings.select(
        F.col(vec_id_col).cast("long").alias("id"),
        F.round(cosine_expr(vec_col, query_vector) * 10000).cast("long").alias("score_i"),
    )
    sem_top = sem_scored.orderBy(F.col("score_i").desc(), F.col("id")).limit(k_semantic)
    w_sem = Window.orderBy(F.col("score_i").desc(), F.col("id"))
    sem_top = sem_top.select(
        F.lit("semantic").alias("result_type"),
        "id",
        "score_i",
        F.row_number().over(w_sem).cast("int").alias("rank"),
    )
    sem_found = sem_scored.agg(F.count(F.lit(1)).alias("found")).withColumn(
        "result_type", F.lit("semantic")
    )

    index = build_inverted_index(documents, text_col, doc_id_col)
    txt_scored = search_terms(index, terms, k=k_text).select(
        F.col("id").cast("long").alias("id"),
        (F.col("score") * 10000).cast("long").alias("score_i"),
    )
    w_txt = Window.orderBy(F.col("score_i").desc(), F.col("id"))
    txt_top = txt_scored.select(
        F.lit("text").alias("result_type"),
        "id",
        "score_i",
        F.row_number().over(w_txt).cast("int").alias("rank"),
    )
    q = documents.sparkSession.createDataFrame(
        [(t,) for t in sorted({t.lower() for t in terms})], "token string"
    )
    txt_found = (
        index.join(F.broadcast(q), "token")
        .select("id")
        .distinct()
        .agg(F.count(F.lit(1)).alias("found"))
        .withColumn("result_type", F.lit("text"))
    )

    found = sem_found.unionByName(txt_found)
    return (
        sem_top.unionByName(txt_top)
        .join(F.broadcast(found), "result_type")
        .select("result_type", "id", "score_i", "rank", F.col("found").cast("long").alias("found"))
    )


# --- web-search query syntax (Q4 postgres parity) ------------------------------------

import re as _re

_WS_TOKEN = _re.compile(r'-?"[^"]*"|\S+')


def parse_websearch(query: str) -> list[dict]:
    """Parse the ``websearch_to_tsquery`` surface the reference's postgres arm
    exposes (postgresVectorDb.py:479,490-493):

    * bare words AND together;
    * ``"double quoted"`` matches the words consecutively (a phrase);
    * ``OR`` joins the items on either side into a disjunction;
    * a ``-`` prefix (word or phrase) negates the item.

    Returns a CONJUNCTION of groups ``[{"any": [item, ...], "negated": bool}]``
    — items inside a group OR together; a negated item forms its own
    single-item group (postgres likewise refuses to OR into a negation, so
    ``a OR -b`` degrades to ``a AND NOT b``).  Items are normalized to
    lowercase single-spaced strings; empty items (e.g. ``""``) drop out.
    """
    groups: list[dict] = []
    pending_or = False
    for raw in _WS_TOKEN.findall(query):
        if raw.upper() == "OR":
            pending_or = True
            continue
        negated = raw.startswith("-")
        body = raw[1:] if negated else raw
        if len(body) >= 2 and body.startswith('"') and body.endswith('"'):
            body = body[1:-1]
        item = _re.sub(r"\s+", " ", body.strip().lower())
        if not item:
            pending_or = False
            continue
        if pending_or and not negated and groups and not groups[-1]["negated"]:
            groups[-1]["any"].append(item)
        else:
            groups.append({"any": [item], "negated": negated})
        pending_or = False
    return groups


def websearch_match(text_col, query: str):
    """Compile a websearch query to ONE boolean Column over `text_col`.

    Word and phrase items both evaluate as space-padded substring containment
    over the whitespace-normalized lowercased text (`` text `` ⊇ `` item ``)
    — a word is a one-token phrase, so a single normalization serves both,
    and the whole predicate stays a pure JVM expression (no python, no
    explode): at 100 TB this is a narrow filter that pushes into the scan's
    WholeStageCodegen span.  The same normalization is SQL-expressible, so
    websearch queries are DuckDB-oracle-gateable (see
    __spark_entry__.websearch_parse_filter)."""
    from functools import reduce

    padded = F.concat(
        F.lit(" "), F.regexp_replace(F.lower(F.trim(text_col)), r"\s+", " "), F.lit(" ")
    )
    conj = None
    for g in parse_websearch(query):
        p = reduce(
            lambda a, b: a | b, [F.instr(padded, f" {item} ") > 0 for item in g["any"]]
        )
        if g["negated"]:
            p = ~p
        conj = p if conj is None else conj & p
    return conj if conj is not None else F.lit(True)


# --- positional index: phrase search as a dataflow -----------------------------------


def build_positional_index(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(token, id, pos) POSITIONAL posting table (pos = 0-based token offset).

    The scale path for phrase queries: `websearch_match` evaluates phrases as
    substring containment — a full corpus scan per query, fine as a filter
    inside another plan but wrong as the primary access path at 100 TB.  A
    positional index is written once (bucketed by token, like
    `write_bucketed_postings`) and each phrase query touches only its terms'
    posting lists."""
    return (
        df.select(
            F.col(id_col).alias("id"),
            F.posexplode(tokenize(F.col(text_col))).alias("pos", "token"),
        )
        .filter(F.col("token") != "")
    )


def search_phrase(
    index_pos: DataFrame, phrase: str, k: int = 20
) -> DataFrame:
    """Exact phrase search over a positional posting table: top-k
    ``(id, n_occurrences)`` of docs containing the words of ``phrase``
    consecutively.

    Dataflow (the classic positional-intersection): for the i-th phrase word,
    take its postings shifted by -i (``pos - i``) — a phrase occurrence is a
    (id, start) group where ALL n words land on the same shifted position.
    One broadcast of the n-row term list, one aggregation keyed (id, start),
    one per-doc count: the corpus text is never rescanned, and the join fans
    out only the phrase terms' postings.  Repeated words in the phrase are
    handled by counting per-slot matches (a slot hits iff its (token, offset)
    pair matches), not distinct tokens."""
    words = [w for w in phrase.lower().split() if w]
    if not words:
        raise ValueError("empty phrase")
    spark = index_pos.sparkSession
    slots = spark.createDataFrame(
        [(w, i) for i, w in enumerate(words)], "token string, offset int"
    )
    starts = (
        index_pos.join(F.broadcast(slots), "token")
        .select("id", (F.col("pos") - F.col("offset")).alias("start"))
        .groupBy("id", "start")
        .agg(F.count(F.lit(1)).alias("n_slots"))
        # every slot present at this start → a phrase occurrence.  Token
        # positions are unique per doc, so each (slot, start) contributes ≤1.
        .filter(F.col("n_slots") == len(words))
    )
    return (
        starts.groupBy("id")
        .agg(F.count(F.lit(1)).cast("long").alias("n_occurrences"))
        .orderBy(F.col("n_occurrences").desc(), F.col("id"))
        .limit(k)
    )


# --- BM25 ranking --------------------------------------------------------------------


def search_terms_bm25(
    index: DataFrame,
    doc_lengths: DataFrame,
    terms: Sequence[str],
    k: int = 20,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """BM25-ranked top-k over a posting table — the ranking the reference's
    engines delegate to their stores (postgres ts_rank / typesense text
    match); BM25 (the Lucene/ES default) is the standard recast.

    score(d) = Σ_t idf(t) · tf/(tf + k1·(1 − b + b·dl/avgdl)),
    idf(t) = ln(1 + (N − df + 0.5)/(df + 0.5))  (Lucene's non-negative form).

    Inputs: `index` = (token, id, tf) from `build_inverted_index`;
    `doc_lengths` = (id, dl) token counts per doc (NOT derivable from the
    filtered postings — BM25 normalizes by full document length).

    Scale shape: postings filter to the broadcast term set FIRST, so df/idf
    aggregate over term-postings only (tiny); N and avgdl are one scalar agg
    broadcast as a 1-row cross join; the only corpus-sized shuffle is the
    per-doc score sum.  Emits score_i = round(1e4·score) — the scaled-int
    discipline (identical double-math formula on the oracle side)."""
    terms = sorted({t.lower() for t in terms})
    spark = index.sparkSession
    q = spark.createDataFrame([(t,) for t in terms], "token string")
    scored = (
        _bm25_contrib_hits(index, doc_lengths, q, k1, b)
        .groupBy("id")
        .agg(
            F.round(F.sum("contrib") * 10000).cast("long").alias("score_i"),
            F.countDistinct("token").cast("int").alias("n_terms"),
        )
    )
    return scored.orderBy(F.col("score_i").desc(), F.col("id")).limit(k)


def _bm25_contrib_hits(
    index: DataFrame,
    doc_lengths: DataFrame,
    query: DataFrame,
    k1: float,
    b: float,
) -> DataFrame:
    """The ONE BM25 formula both ranked search and hard-negative mining
    score with (fix the math HERE, once — the _fuzzy_vocab_match rule):
    per-(query-row, id, token) double ``contrib`` = idf·tf/(tf + k1·(1−b +
    b·dl/avgdl)), Lucene's non-negative idf.  ``query`` is a broadcastable
    (token[, qid…]) frame; df/idf are GLOBAL per token regardless of how
    many query rows share the term."""
    stats = doc_lengths.agg(
        F.count(F.lit(1)).cast("double").alias("n_docs"),
        F.avg("dl").alias("avgdl"),
    )
    hits = index.join(F.broadcast(query), "token")
    df_per_term = (
        index.join(F.broadcast(query.select("token").distinct()), "token")
        .groupBy("token")
        .agg(F.countDistinct("id").alias("df"))
    )
    return (
        hits.join(F.broadcast(df_per_term), "token")
        .join(doc_lengths, "id")
        .crossJoin(F.broadcast(stats))
        .withColumn(
            "idf",
            F.log(F.lit(1.0) + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)),
        )
        .withColumn(
            "contrib",
            F.col("idf")
            * F.col("tf")
            / (F.col("tf") + k1 * (1.0 - b + b * F.col("dl") / F.col("avgdl"))),
        )
    )


def best_snippet(
    docs: DataFrame,
    terms: list[str],
    window: int = 10,
    content_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Query-biased snippet selection (the search-result preview): per
    document, the ``window``-token span with the MOST query-term hits, ties
    to the earliest start — (id, start, n_hits, snippet).  Documents with no
    hit emit nothing.

    Candidate starts are HIT positions only (the optimal window can always
    shift right until its first slot is a hit without losing hits), so the
    per-doc work is |hits|² at worst, never |tokens|² — and |hits| is query-
    term-frequency bounded.  One doc-keyed pair join + one doc-partitioned
    row_number window; the token array stays with the doc row (no re-scan
    for the snippet text).  1-based positions (cross-engine slice parity)."""
    if window < 1:
        raise ValueError("window must be >= 1")
    if not terms:
        raise ValueError("terms must be non-empty")
    toks = docs.select(
        F.col(id_col).alias("id"),
        F.split(F.lower(F.trim(F.col(content_col))), r"\s+").alias("t"),
    )
    hits = (
        toks.select("id", F.posexplode("t").alias("pos0", "tok"))
        .filter(F.col("tok").isin([t.lower() for t in terms]))
        .select("id", (F.col("pos0") + 1).alias("p"))
    )
    a, b = hits.alias("a"), hits.alias("b")
    scored = (
        a.join(
            b,
            (F.col("b.id") == F.col("a.id"))
            & (F.col("b.p") >= F.col("a.p"))
            & (F.col("b.p") < F.col("a.p") + window),
        )
        .groupBy(F.col("a.id").alias("id"), F.col("a.p").alias("start"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_hits"))
    )
    from pyspark.sql.window import Window

    w = Window.partitionBy("id").orderBy(F.desc("n_hits"), F.asc("start"))
    best = (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .drop("rk")
    )
    return best.join(toks, "id").select(
        "id",
        F.col("start").cast("long").alias("start"),
        "n_hits",
        F.array_join(F.slice("t", F.col("start"), window), " ").alias("snippet"),
    )


def percolate_conjunctive(
    docs: DataFrame,
    queries: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    qid_col: str = "query_id",
    qtext_col: str = "query",
) -> DataFrame:
    """Reverse search (the Percolator pattern): which SAVED queries match
    each incoming document — the alerting primitive a crawl pipeline runs
    at ingest ("tell me when a page mentions all of X Y Z").  Conjunctive
    semantics: a query matches iff EVERY one of its distinct tokens occurs
    in the document — so a TOKEN-LESS query (empty, whitespace-only, or
    NULL text) is a vacuous conjunction and matches ALL documents, the
    percolator convention (match-all, never a silent no-match).  Returns
    (id, query_id), one row per match.

    100 TB shape: the query registry is broadcast TWICE (term list and
    per-query term counts — registries are KB-scale); the corpus-side
    explode keeps DISTINCT doc tokens only, and the one exchange is the
    (id, query_id) coverage count.  No per-query corpus scan, no union
    fan-out — K queries cost one shared pass."""
    qtok = F.array_distinct(F.filter(tokenize(F.col(qtext_col)), lambda t: t != ""))
    qterms = queries.select(
        F.col(qid_col).alias("query_id"), F.explode(qtok).alias("token")
    )
    qsizes = qterms.groupBy("query_id").agg(
        F.count(F.lit(1)).cast("long").alias("_n_terms")
    )
    dtok = docs.select(
        F.col(id_col).alias("id"),
        F.explode(
            F.array_distinct(F.filter(tokenize(F.col(text_col)), lambda t: t != ""))
        ).alias("token"),
    )
    hits = (
        dtok.join(F.broadcast(qterms), "token")
        .groupBy("id", "query_id")
        .agg(F.count(F.lit(1)).cast("long").alias("_n_hit"))
    )
    # vacuous conjunction: queries with zero tokens match every document
    # (a KB-scale broadcast against the doc-id projection — no text scan)
    match_all = queries.select(
        F.col(qid_col).alias("query_id"),
        F.coalesce(F.size(qtok), F.lit(0)).alias("_n"),
    ).filter(F.col("_n") <= 0)
    vacuous = docs.select(F.col(id_col).alias("id")).crossJoin(
        F.broadcast(match_all.select("query_id"))
    )
    return (
        hits.join(F.broadcast(qsizes), "query_id")
        .filter(F.col("_n_hit") == F.col("_n_terms"))
        .select("id", "query_id")
        .unionByName(vacuous)
    )


def prf_expansion_terms(
    index: DataFrame,
    terms: Sequence[str],
    k_docs: int = 10,
    k_terms: int = 8,
    min_token_len: int = 3,
    stop_tokens: Sequence[str] = (),
) -> DataFrame:
    """(token, score, df_fb) pseudo-relevance-feedback query expansion
    (RM1-lite, Lavrenko & Croft 2001): run the seed query, take the top
    ``k_docs`` feedback documents, and rank the terms THOSE docs contain by
    feedback weight ``score = Σ_d tf(t, d)`` with doc-frequency-in-feedback
    ``df_fb`` for the consumer's reweighting — the "searches related to"
    primitive, and the recall arm a fixed-vocabulary query misses.

    Seed terms, sub-minimum-length tokens, and caller stop tokens are
    excluded from the expansion (they are the query, not its neighborhood).

    Deterministic: feedback docs = the ``search_terms`` contract (score
    desc, id asc); expansion order = score desc, df_fb desc, token asc.

    100 TB shape: the feedback-doc id set is ≤ k_docs rows — BROADCAST back
    against the posting table, so the expansion aggregates over feedback
    postings only (thousands of rows), never the corpus; the seed search
    itself is the existing broadcast-term-set path.
    """
    fb = search_terms(index, terms, k=k_docs).select("id")
    excluded = {t.lower() for t in terms} | {t.lower() for t in stop_tokens}
    fb_postings = index.join(F.broadcast(fb), "id").filter(
        (F.length("token") >= min_token_len)
        & ~F.col("token").isin(*sorted(excluded))
    )
    return (
        fb_postings.groupBy("token")
        .agg(
            F.sum("tf").cast("long").alias("score"),
            F.countDistinct("id").cast("int").alias("df_fb"),
        )
        .orderBy(F.col("score").desc(), F.col("df_fb").desc(), F.col("token"))
        .limit(k_terms)
    )


def _wand_parts(
    index: DataFrame,
    doc_lengths: DataFrame,
    term_weights: dict[str, int],
    k: int,
    norm_k: int,
):
    """Shared WAND machinery → (post, theta, survivors).  All arithmetic is
    exact BIGINT so the pruned result can hash-match an unpruned oracle."""
    spark = index.sparkSession
    q = spark.createDataFrame(sorted(term_weights.items()), "token string, w long")
    post = index.join(F.broadcast(q), "token")

    ub_t = post.groupBy("token").agg(F.max(F.col("tf") * F.col("w")).alias("ub"))

    # θ = the k-th best EXACT partial score over the highest-upper-bound
    # term's postings — a valid lower bound on the true k-th best score
    # (each partial ≤ that doc's full score), or 0 when the driver term has
    # fewer than k postings (no pruning, still correct)
    driver = ub_t.orderBy(F.col("ub").desc(), F.col("token")).limit(1)
    theta = (
        post.join(F.broadcast(driver.select("token")), "token")
        .join(doc_lengths, "id")
        .select(F.expr(f"(tf * w * 10000) div ({norm_k} + dl)").alias("p"))
        .orderBy(F.col("p").desc())
        .limit(k)
        .agg(F.when(F.count("*") >= k, F.min("p")).otherwise(F.lit(0)).alias("theta"))
    )
    # per-doc ceiling uses the doc's OWN length norm (as in classic WAND,
    # where the norm rides the posting entry) — a corpus-min denominator is
    # provably safe but too loose to prune anything when lengths vary
    survivors = (
        post.join(F.broadcast(ub_t), "token")
        .groupBy("id")
        .agg(F.sum("ub").alias("ub_sum"))
        .join(doc_lengths, "id")
        .crossJoin(F.broadcast(theta))
        .filter(F.expr(f"(ub_sum * 10000) div ({norm_k} + dl) >= theta"))
        .select("id")
    )
    return post, theta, survivors


def wand_topk(
    index: DataFrame,
    doc_lengths: DataFrame,
    term_weights: dict[str, int],
    k: int = 10,
    norm_k: int = 50,
) -> DataFrame:
    """(id, score_i, n_terms) top-k by length-normalized weighted tf
    ``score = (Σ_t w_t·tf) · 10000 div (norm_k + dl)`` with WAND/MaxScore
    candidate pruning (Broder 2003 / Turtle–Flood MaxScore): per-term upper
    bounds ``max(tf·w)`` + the global min doc length give each doc a cheap
    score ceiling; docs whose ceiling is below θ (the k-th best exact
    partial score on the highest-bound term's postings) are eliminated
    BEFORE the expensive stage.  Provably identical to the unpruned top-k —
    every pruned doc's true score < θ ≤ the true k-th best.

    100 TB shape: the UB pass touches only the skinny (token, id, tf)
    postings of the query terms plus the (id, dl) norm table (in a classic
    index layout the norm rides the posting entry); the EXPENSIVE stage —
    full scoring, and in a real index positions/proximity/ML features —
    runs on SURVIVORS only.  θ and the bound tables are 1-row / |q|-row
    broadcasts; nothing corpus-wide shuffles beyond the postings.
    """
    post, _theta, survivors = _wand_parts(index, doc_lengths, term_weights, k, norm_k)
    return (
        post.join(survivors, "id")
        .groupBy("id")
        .agg(
            F.sum(F.col("tf") * F.col("w")).alias("_s"),
            F.countDistinct("token").cast("int").alias("n_terms"),
        )
        .join(doc_lengths, "id")
        .select(
            "id",
            F.expr(f"(_s * 10000) div ({norm_k} + dl)").cast("long").alias("score_i"),
            "n_terms",
        )
        .orderBy(F.col("score_i").desc(), F.col("id"))
        .limit(k)
    )


def wand_prune_stats(
    index: DataFrame,
    doc_lengths: DataFrame,
    term_weights: dict[str, int],
    k: int = 10,
    norm_k: int = 50,
) -> tuple[int, int, int]:
    """(n_or_docs, n_survivors, theta) — how much the WAND bound actually
    pruned; the test hook that keeps the scale path honest (a θ of 0 or
    survivors == OR-docs means the 'pruning' is vacuous)."""
    post, theta, survivors = _wand_parts(index, doc_lengths, term_weights, k, norm_k)
    n_or = post.select("id").distinct().count()
    n_sv = survivors.count()
    th = theta.collect()[0]["theta"]
    return n_or, n_sv, int(th)


def spell_correct_terms(
    index: DataFrame,
    terms: Sequence[str],
    max_edits: int = 2,
) -> DataFrame:
    """(term, suggestion, edits, freq) — noisy-channel query spelling
    correction: each query term maps to its best vocabulary candidate by
    (edit distance asc, corpus frequency desc, token asc) — the classic
    "did you mean" ranking where the channel prefers fewer edits and the
    language-model prior breaks ties by unigram frequency.  An in-vocab
    term corrects to itself (0 edits beats everything); a term with no
    candidate within ``max_edits`` emits NO row (visible absence).

    100 TB shape: same contract as search_terms_fuzzy — the edit-distance
    match runs against the DISTINCT VOCABULARY (orders smaller than the
    postings), broadcast-nested-loop of the tiny term list with the
    |len Δ| ≤ max_edits length prefilter; the per-term argmin is a window
    over candidates only.
    """
    from pyspark.sql.window import Window

    vocab = index.groupBy("token").agg(F.sum("tf").cast("long").alias("freq"))
    cands = _fuzzy_vocab_match(vocab, terms, max_edits).withColumn(
        "edits", F.levenshtein("token", "term").cast("int")
    )
    w = Window.partitionBy("term").orderBy(
        F.col("edits"), F.col("freq").desc(), F.col("token")
    )
    return (
        cands.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select("term", F.col("token").alias("suggestion"), "edits", "freq")
    )


def rrf_fuse(
    runs: Sequence[DataFrame],
    k: int = 20,
    rrf_k: int = 60,
    id_col: str = "id",
    rank_col: str = "rank",
) -> DataFrame:
    """(id, rrf_mi, n_arms) top-k reciprocal-rank fusion (Cormack et al.
    2009) of N ranked runs: ``rrf = Σ_arms 1/(rrf_k + rank)`` — THE
    standard score-free way to merge heterogeneous retrieval arms (lexical
    + semantic + fuzzy) whose raw scores are incomparable; rank is all that
    transfers.

    Exactness: each reciprocal enters as ``1_000_000 div (rrf_k + rank)``
    (integer floor, identical in any SQL oracle) and the fused score is an
    exact BIGINT sum.  Ties order by (rrf_mi desc, n_arms desc, id asc).

    100 TB shape: the runs are ALREADY top-k outputs (tiny frames) — the
    union-then-aggregate here moves O(Σ|runs|) rows no matter how big the
    corpus behind them was; fusion is never the bottleneck, and the arms
    keep their own optimal plans.
    """
    if not runs:
        raise ValueError("rrf_fuse needs at least one run")
    # per-run min-rank dedup: a run carrying an id twice (tie expansion,
    # upstream unions) must contribute ONE reciprocal, or n_arms inflates
    parts = [
        r.select(F.col(id_col).alias("id"), F.col(rank_col).alias("_rank"))
        .groupBy("id")
        .agg(F.min("_rank").alias("_rank"))
        .select(
            "id",
            F.expr(f"1000000 div ({int(rrf_k)} + `_rank`)").cast("long").alias("_rr"),
        )
        for r in runs
    ]
    allp = parts[0]
    for p in parts[1:]:
        allp = allp.unionByName(p)
    return (
        allp.groupBy("id")
        .agg(
            F.sum("_rr").cast("long").alias("rrf_mi"),
            F.count(F.lit(1)).cast("int").alias("n_arms"),
        )
        .orderBy(F.col("rrf_mi").desc(), F.col("n_arms").desc(), F.col("id"))
        .limit(k)
    )


def _leb128_hex(d):
    """Little-endian base-128 (LEB128 / protobuf varint) hex of a delta,
    unrolled to 4 continuation groups (28 bits — doc-id deltas in a
    posting list, which are gaps, not absolute ids; a gap ≥ 2^28 means a
    token appearing once per 268M docs and belongs in a wider unroll).
    Pure JVM bit ops + hex, no python."""
    g0, g1 = d % 128, F.shiftright(d, 7) % 128
    g2, g3 = F.shiftright(d, 14) % 128, F.shiftright(d, 21) % 128
    bh = lambda x: F.lpad(F.lower(F.hex(x.cast("long"))), 2, "0")  # noqa: E731
    return (
        F.when(d < 128, bh(g0))
        .when(d < 128 * 128, F.concat(bh(g0 + 128), bh(g1)))
        .when(d < 128 * 128 * 128, F.concat(bh(g0 + 128), bh(g1 + 128), bh(g2)))
        .otherwise(F.concat(bh(g0 + 128), bh(g1 + 128), bh(g2 + 128), bh(g3)))
    )


def postings_varint_stats(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id", top_k: int = 30
) -> DataFrame:
    """(token, n_docs, raw_bytes, varint_bytes, ratio_i, hex_postings) —
    delta + LEB128-varint compression of each token's posting list (the
    Lucene/PForDelta-family storage layout every web-scale index uses:
    sorted doc ids → gaps → variable-width bytes).  First gap is the
    absolute first id (standard framing).  raw_bytes = 8·n_docs (int64
    ids); ratio_i = varint_bytes·1e4 div raw_bytes.  Top-k most-common
    tokens by (n_docs desc, token) so the densest (best-compressing)
    lists are the gate's subject.

    Determinism: sorted ids → gaps → per-gap hex is all exact; the full
    hex string is the hash-gated artifact, so a single wrong byte fails.

    100 TB shape: posting lists aggregate per token (one shuffle on the
    token key — same key the bucketed-postings layout already uses);
    the encode is a JVM array fold per token, no python, no second
    shuffle.  collect_list is posting-list sized — the same per-token
    memory any posting materialization (including Lucene's) requires;
    beyond that, lists split into fixed-width blocks upstream.
    """
    idx = build_inverted_index(docs, text_col, id_col)
    lists = idx.groupBy("token").agg(
        F.sort_array(F.collect_list(F.col("id").cast("long"))).alias("ids"),
        F.count(F.lit(1)).cast("long").alias("n_docs"),
    )
    # gaps: first absolute, then deltas (ids are distinct so gaps ≥ 1)
    gaps = F.concat(
        F.slice("ids", 1, 1),
        F.zip_with(
            F.slice("ids", 2, F.size("ids") - 1),
            F.slice("ids", 1, F.size("ids") - 1),
            lambda a, b: a - b,
        ),
    )
    enc = lists.withColumn(
        "hex_postings",
        F.array_join(F.transform(F.when(F.size("ids") > 1, gaps).otherwise(F.col("ids")), _leb128_hex), ""),
    )
    return (
        enc.select(
            "token",
            "n_docs",
            (F.lit(8) * F.col("n_docs")).cast("long").alias("raw_bytes"),
            (F.length("hex_postings") / 2).cast("long").alias("varint_bytes"),
            "hex_postings",
        )
        .withColumn("ratio_i", F.expr("(varint_bytes * 10000) div raw_bytes").cast("long"))
        .orderBy(F.col("n_docs").desc(), "token")
        .limit(top_k)
    )


def varint_decode_hex(hex_str: str) -> list:
    """Driver-side LEB128 decoder for the roundtrip test (not a Spark op)."""
    data = bytes.fromhex(hex_str)
    vals, cur, shift = [], 0, 0
    for b in data:
        cur |= (b & 0x7F) << shift
        if b & 0x80:
            shift += 7
        else:
            vals.append(cur)
            cur, shift = 0, 0
    out = []
    for i, g in enumerate(vals):
        out.append(g if i == 0 else out[-1] + g)
    return out


def dirichlet_ql_rank(
    docs: DataFrame,
    terms: Sequence[str],
    mu: int = 2000,
    k: int = 10,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(id, n_hit_terms, score_i) — query-likelihood ranking with Dirichlet
    smoothing (Zhai & Lafferty 2001), the LM alternative to BM25:
    score = Σ_t ln((tf_td·|C| + μ·cf_t) / (|C|·(dl_d + μ))).  Candidate
    docs match ≥ 1 term; ABSENT query terms still contribute their
    background (smoothing) mass — that is the point of the model, and the
    left join supplies tf = 0 for them.

    Float discipline: per-(doc, term) round(1e6·ln(·)) BIGINT, then an
    integer sum — order-independent, cross-engine exact (the
    unigram_logprob_scores pattern).  One division then one ln, written
    identically in the oracle.

    100 TB shape: corpus stats (cf per query term, |C|) are query-sized
    and broadcast; candidates come off the token-keyed index; the per-doc
    frame is |candidates|×|q| rows.  Top-k is TakeOrderedAndProject.
    """
    terms = [t.lower() for t in terms]
    idx = build_inverted_index(docs, text_col, id_col)
    toks = docs.select(
        F.col(id_col).alias("id"),
        F.explode(tokenize(F.col(text_col))).alias("token"),
    ).filter(F.col("token") != "")
    dl = toks.groupBy("id").agg(F.count(F.lit(1)).cast("long").alias("dl"))
    total = toks.agg(F.count(F.lit(1)).cast("long").alias("_ctotal"))
    q = idx.sparkSession.createDataFrame([(t,) for t in terms], "token string")
    cf = (
        toks.join(F.broadcast(q), "token")
        .groupBy("token")
        .agg(F.count(F.lit(1)).cast("long").alias("cf"))
        .join(F.broadcast(q), "token", "right")
        .fillna(0, subset=["cf"])
    )
    # OOV query terms (cf = 0) would put ln(0) on every candidate — a
    # uniform -inf shift; the standard treatment drops them from the score
    cand = idx.join(F.broadcast(q), "token").select("id").distinct()
    grid = cand.crossJoin(F.broadcast(cf.filter(F.col("cf") > 0).crossJoin(total)))
    scored = (
        grid.join(idx, ["id", "token"], "left")
        .fillna(0, subset=["tf"])
        .join(dl, "id")
        .withColumn(
            "contrib_i",
            F.round(
                F.log(
                    (F.col("tf") * F.col("_ctotal") + F.lit(mu) * F.col("cf"))
                    / (F.col("_ctotal") * (F.col("dl") + F.lit(mu)))
                )
                * 1e6
            ).cast("long"),
        )
        .groupBy("id")
        .agg(
            F.sum(F.when(F.col("tf") > 0, 1).otherwise(0)).cast("long").alias("n_hit_terms"),
            F.sum("contrib_i").cast("long").alias("score_i"),
        )
    )
    return scored.orderBy(F.col("score_i").desc(), F.col("id")).limit(k)


def sdm_score(
    docs: DataFrame,
    query_terms: Sequence[str],
    id_col: str = "doc_id",
    text_col: str = "text",
    w_term: int = 85,
    w_ordered: int = 10,
    w_unordered: int = 5,
    window: int = 8,
    k: int = 15,
) -> DataFrame:
    """Sequential Dependence Model ranking (Metzler & Croft 2005): the
    three MRF feature classes with INTEGER weights —

    * term:      Σ_q tf(q)
    * ordered:   Σ adjacent query pairs  #1(q_i q_{i+1})  — exact-adjacency
                 bigram occurrences
    * unordered: Σ adjacent query pairs  #uw8(q_i, q_{i+1}) — position
                 pairs of the two terms within ``window`` of each other,
                 either order (|p_a − p_b| ≤ window − 1, p_a ≠ p_b)

    score = w_term·T + w_ordered·O + w_unordered·U, ranked desc with id
    tie-break, top-k.

    Spark-first shape: per-term POSITION ARRAYS come from one indexed
    F.transform + F.filter over the token array, and both proximity
    counts are F.aggregate folds over those arrays — the whole scorer is
    a zero-shuffle JVM projection followed by TakeOrderedAndProject(k).
    For a q-term query that's O(q·len) per doc with no explode; the
    posting-list alternative (build_positional_index + self-joins) only
    wins when the query set is large and reused — percolate territory."""
    toks = tokenize(F.col(text_col))

    def positions(term: str):
        def mark(tt: str):
            return lambda x, i: F.when(x == tt, i).otherwise(F.lit(-1))

        return F.filter(
            F.transform(toks, mark(term)), lambda p: p >= 0
        )

    d = docs.select(
        F.col(id_col),
        *[positions(t).alias(f"_p{i}") for i, t in enumerate(query_terms)],
    )
    tf_total = sum(
        (F.size(F.col(f"_p{i}")) for i in range(len(query_terms))),
        F.lit(0),
    )

    def pair_counts(a, b, pred):
        def step(acc, p):
            return acc + F.size(F.filter(b, pred(p))).cast("long")

        return F.aggregate(a, F.lit(0).cast("long"), step)

    ordered = F.lit(0).cast("long")
    unordered = F.lit(0).cast("long")
    for i in range(len(query_terms) - 1):
        a, b = F.col(f"_p{i}"), F.col(f"_p{i + 1}")
        ordered = ordered + pair_counts(a, b, lambda p: (lambda q: q == p + 1))
        unordered = unordered + pair_counts(
            a,
            b,
            lambda p: (
                lambda q: (F.abs(q - p) <= window - 1) & (q != p)
            ),
        )
    scored = d.select(
        id_col,
        tf_total.cast("long").alias("tf_total"),
        ordered.alias("ordered_hits"),
        unordered.alias("unordered_hits"),
    ).withColumn(
        "sdm_score",
        (
            F.lit(w_term) * F.col("tf_total")
            + F.lit(w_ordered) * F.col("ordered_hits")
            + F.lit(w_unordered) * F.col("unordered_hits")
        ).cast("long"),
    )
    return scored.orderBy(F.col("sdm_score").desc(), F.col(id_col)).limit(k)


def mine_hard_negatives(
    index: DataFrame,
    doc_lengths: DataFrame,
    query_terms: dict[str, Sequence[str]],
    positives: DataFrame,
    n_neg: int = 3,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """DPR-style hard-negative mining (Karpukhin et al. 2020): for each
    training query, the negatives that teach the most are the docs BM25
    ranks highest WITHOUT being gold — lexically confusable, semantically
    wrong.  ``positives`` = (qid, id) gold pairs; returns (qid, neg_id,
    score_i, neg_rank) with the ``n_neg`` top-scored non-gold docs per
    query.

    Shares :func:`_bm25_contrib_hits` with search_terms_bm25 (one formula,
    one place); each term's contrib rounds to a scaled int BEFORE the
    integer sum (the ROUND-SUM rule — a 3-term float sum is summation-
    order dependent); df/idf are GLOBAL per token (shared across queries
    sharing a term).

    Scale shape: the query table is (qid, token) broadcast; postings filter
    to it first; the only corpus-sized shuffle is the (qid, id) score sum;
    the per-qid top-n window runs over candidate docs of that query only
    (WindowGroupLimit partial rank at scale)."""
    from pyspark.sql.window import Window

    rows = sorted(
        {(qid, t.lower()) for qid, terms in query_terms.items() for t in terms}
    )
    spark = index.sparkSession
    q = spark.createDataFrame(rows, "qid string, token string")
    # per-TERM scaled-int rounding BEFORE the integer sum (the dirichlet /
    # ROUND-SUM rule): a 3+-term float sum rounds summation-order-
    # dependently, and partial aggregation orders differ across engines
    scored = (
        _bm25_contrib_hits(index, doc_lengths, q, k1, b)
        .withColumn(
            "term_i", F.round(F.col("contrib") * 10000).cast("long")
        )
        .groupBy("qid", "id")
        .agg(F.sum("term_i").cast("long").alias("score_i"))
    )
    neg = scored.join(positives.select("qid", "id"), ["qid", "id"], "left_anti")
    w = Window.partitionBy("qid").orderBy(F.desc("score_i"), F.col("id"))
    return (
        neg.withColumn("neg_rank", F.row_number().over(w).cast("long"))
        .filter(F.col("neg_rank") <= n_neg)
        .select("qid", F.col("id").alias("neg_id"), "score_i", "neg_rank")
    )


def autocomplete_prefix_topk(
    df: DataFrame,
    text_col: str = "text",
    min_len: int = 2,
    max_len: int = 5,
    k: int = 3,
) -> DataFrame:
    """Typeahead completion table: for every term prefix of length
    [min_len, max_len], the top-k completions by corpus frequency (freq
    desc, term asc — the deterministic typeahead contract).  A term whose
    full length L ≤ max_len contributes itself as its own completion (the
    standard trie semantics).

    Scale shape: the corpus collapses to the (term, freq) vocabulary
    FIRST; prefixes explode off vocab rows (≤ max_len−min_len+1 per term);
    the rank window partitions by prefix over completion-sized groups
    (WindowGroupLimit at scale) — the corpus never reaches the window.
    Returns (prefix, term, freq, rnk)."""
    from pyspark.sql.window import Window

    vocab = (
        df.select(F.explode(tokenize(F.col(text_col))).alias("term"))
        .filter((F.col("term") != "") & (F.length("term") >= min_len))
        .groupBy("term")
        .agg(F.count(F.lit(1)).cast("long").alias("freq"))
    )
    pref = vocab.select(
        "term",
        "freq",
        F.explode(
            F.transform(
                F.sequence(F.lit(min_len), F.least(F.lit(max_len), F.length("term"))),
                lambda L: F.col("term").substr(F.lit(1), L),
            )
        ).alias("prefix"),
    )
    w = Window.partitionBy("prefix").orderBy(F.desc("freq"), F.col("term"))
    return (
        pref.withColumn("rnk", F.row_number().over(w).cast("long"))
        .filter(F.col("rnk") <= k)
        .select("prefix", "term", "freq", "rnk")
    )


def elias_fano_postings_stats(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    top_k: int = 30,
) -> DataFrame:
    """Elias–Fano posting-list size accounting (Vigna 2013 quasi-succinct
    indices — the modern monotone-sequence encoding next to the
    delta+LEB128 varint already gated by postings_varint_stats): for a
    sorted id list of length n over universe u = max_id + 1,

        l        = max(0, ⌊log2(u / n)⌋)          (low-bit width)
        ef_bits  = n·l  +  n + (max_id >> l) + 1   (lows + unary highs)

    all from exact integer bit-length arithmetic (⌊log2 x⌋ = bitlen(x)−1 —
    no float log).  Output per token: (token, n_docs, max_id, low_bits,
    ef_bits, plain_bits = 64·n, ratio_i = plain·10⁴ div ef) for the top_k
    most frequent tokens (n_docs desc, token) — the encoding-planner
    decision surface, same family as column_encoding_stats.

    One (token, id) aggregate + one token rollup; shuffle rows are 8-byte
    pairs, never text."""
    post = build_inverted_index(df, text_col, id_col)
    agg = post.groupBy("token").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.max(F.col("id").cast("long")).cast("long").alias("max_id"),
    )
    out = (
        agg.withColumn(
            "low_bits",
            F.expr(
                "CAST(CASE WHEN (max_id + 1) div n_docs >= 2 "
                "THEN length(bin((max_id + 1) div n_docs)) - 1 "
                "ELSE 0 END AS BIGINT)"
            ),
        )
        .withColumn(
            "ef_bits",
            F.expr(
                "CAST(n_docs * low_bits + n_docs"
                " + shiftright(max_id, CAST(low_bits AS INT)) + 1 AS BIGINT)"
            ),
        )
        .withColumn("plain_bits", (F.col("n_docs") * 64).cast("long"))
        .withColumn(
            "ratio_i", F.expr("CAST((plain_bits * 10000) div ef_bits AS BIGINT)")
        )
    )
    return out.orderBy(F.desc("n_docs"), "token").limit(top_k)
