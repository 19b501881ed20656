"""Corpus keyword/collocation mining: TextRank (Mihalcea/Tarau '04 —
PageRank over the word co-occurrence graph) and PMI collocations
(Church/Hanks '90).  Both feed KG vocabulary induction: TextRank surfaces
salient relation/entity words, PMI surfaces multi-word surface forms worth
adding to the gazetteer.

Scale design: token filtering and adjacency-pair construction are pure
per-row JVM array expressions (bound()-materialized, no HOF re-eval); the
co-occurrence edge list is distinct-deduped BEFORE PageRank so the iteration
cost is O(vocabulary edges), not O(corpus).  PageRank itself reuses
operators/graph.py::pagerank (per-iteration localCheckpoint, right-sized
partitions).  PMI counts shuffle (token, cnt) / (bigram, cnt) pairs only —
never document text — and the scalar totals (N, B) ride along as literal
aggregates, no driver collect.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.udfs import bound
from .textstats import LANG_STOPWORDS


def is_content_word(x: Column, stopwords: list[str] | None = None) -> Column:
    """The content-word predicate every keyword/summary operator shares:
    pure [a-z], length >= 3, not a stopword."""
    stops = F.array(*[F.lit(w) for w in (stopwords or LANG_STOPWORDS["en"])])
    return x.rlike("^[a-z]{3,}$") & ~F.array_contains(stops, x)


def kept_tokens_expr(text: Column, stopwords: list[str] | None = None) -> Column:
    """Lowercased whitespace tokens filtered to content words
    (:func:`is_content_word`) — the standard TextRank/PMI candidate cut."""
    return F.filter(
        F.split(F.lower(F.trim(text)), r"\s+"),
        lambda x: is_content_word(x, stopwords),
    )


def _adjacent_pairs(tokens: Column) -> Column:
    """struct<a,b> array of consecutive token pairs (the window-2
    co-occurrence of the TextRank paper), NULL when fewer than 2 tokens."""

    def pairs_from(t: Column) -> Column:
        def pair_at(i: Column) -> Column:
            return F.struct(
                F.element_at(t, i).alias("a"), F.element_at(t, i + 1).alias("b")
            )

        # guard: sequence(1, n-1) would run DESCENDING for n < 2
        return F.when(
            F.size(t) >= 2, F.transform(F.sequence(F.lit(1), F.size(t) - 1), pair_at)
        )

    return bound(tokens, pairs_from)


def cooccurrence_edges(
    df: DataFrame, text_col: str = "text", stopwords: list[str] | None = None
) -> DataFrame:
    """Distinct undirected co-occurrence edges (emitted in both directions)
    between consecutive content words."""
    pairs = df.select(
        F.explode(_adjacent_pairs(kept_tokens_expr(F.col(text_col), stopwords))).alias("p")
    ).filter(F.col("p.a") != F.col("p.b"))
    fwd = pairs.select(F.col("p.a").alias("src"), F.col("p.b").alias("dst"))
    rev = pairs.select(F.col("p.b").alias("src"), F.col("p.a").alias("dst"))
    return fwd.unionByName(rev).distinct()


def textrank_keywords(
    df: DataFrame,
    text_col: str = "text",
    k: int = 20,
    iterations: int = 5,
    damping: float = 0.85,
    stopwords: list[str] | None = None,
) -> DataFrame:
    """Top-k corpus keywords by PageRank over the co-occurrence graph,
    integer-scaled (pr_i = round(1e6 * pr)), ties broken on the word."""
    from .graph import pagerank

    edges = cooccurrence_edges(df, text_col, stopwords)
    pr = pagerank(edges, damping=damping, iterations=iterations, num_partitions=8)
    out = pr.select(
        F.col("node").alias("word"),
        F.round(F.col("pr") * 1000000).cast("long").alias("pr_i"),
    )
    return out.orderBy(F.desc("pr_i"), "word").limit(k)


def pmi_collocations(
    df: DataFrame,
    text_col: str = "text",
    min_count: int = 5,
    k: int = 20,
    stopwords: list[str] | None = None,
) -> DataFrame:
    """Top-k adjacent-pair collocations by pointwise mutual information.

    PMI = ln(p(ab) / (p(a)p(b))) with p(ab) = c_ab/B, p(a) = c_a/N, computed
    as ONE ln over one double division of exact BIGINT products — the same
    integer-first discipline as the LM scorers, so DuckDB reproduces the
    rounding exactly.  Unigram counts are taken over the same filtered token
    stream the bigrams come from."""
    toks = df.select(
        F.explode(kept_tokens_expr(F.col(text_col), stopwords)).alias("tok")
    )
    uni = toks.groupBy("tok").agg(F.count(F.lit(1)).cast("long").alias("c"))
    n_total = uni.agg(F.sum("c").cast("long").alias("n")).select("n")

    pairs = df.select(
        F.explode(_adjacent_pairs(kept_tokens_expr(F.col(text_col), stopwords))).alias("p")
    )
    big = (
        pairs.groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
        .agg(F.count(F.lit(1)).cast("long").alias("cab"))
    )
    b_total = big.agg(F.sum("cab").cast("long").alias("bt")).select("bt")

    scored = (
        big.filter(F.col("cab") >= min_count)
        .join(uni.select(F.col("tok").alias("a"), F.col("c").alias("ca")), "a")
        .join(uni.select(F.col("tok").alias("b"), F.col("c").alias("cb")), "b")
        .crossJoin(F.broadcast(n_total))
        .crossJoin(F.broadcast(b_total))
    )
    num = F.col("cab") * F.col("n") * F.col("n")
    den = F.col("bt") * F.col("ca") * F.col("cb")
    pmi_i = F.round(F.lit(10000) * F.log(num.cast("double") / den.cast("double"))).cast(
        "long"
    )
    out = scored.select(
        F.concat_ws(" ", "a", "b").alias("bigram"),
        F.col("cab").alias("pair_l"),
        pmi_i.alias("pmi_i"),
    )
    return out.orderBy(F.desc("pmi_i"), "bigram").limit(k)


def aho_corasick_build(patterns):
    """Build an Aho–Corasick automaton (goto trie + BFS failure links +
    output links) over ``patterns``.  Returns (goto, fail, out) where
    ``goto`` is a list of dicts, ``fail`` the failure-link array and
    ``out`` per-state lists of pattern indexes ending there (output links
    pre-flattened, so matching never walks the suffix chain)."""
    goto = [{}]
    out = [[]]
    for pi, pat in enumerate(patterns):
        st = 0
        for ch in pat:
            if ch not in goto[st]:
                goto.append({})
                out.append([])
                goto[st][ch] = len(goto) - 1
            st = goto[st][ch]
        out[st].append(pi)
    fail = [0] * len(goto)
    from collections import deque

    dq = deque()
    for ch, nxt in goto[0].items():
        fail[nxt] = 0
        dq.append(nxt)
    while dq:
        st = dq.popleft()
        for ch, nxt in goto[st].items():
            dq.append(nxt)
            f = fail[st]
            while f and ch not in goto[f]:
                f = fail[f]
            fail[nxt] = goto[f].get(ch, 0) if goto[f].get(ch, 0) != nxt else 0
            out[nxt] = out[nxt] + out[fail[nxt]]  # flatten output links
    return goto, fail, out


def _ac_count(text: str, goto, fail, out, n_patterns: int):
    counts = [0] * n_patterns
    st = 0
    for ch in text:
        while st and ch not in goto[st]:
            st = fail[st]
        st = goto[st].get(ch, 0)
        for pi in out[st]:
            counts[pi] += 1
    return counts


def multi_pattern_counts_ac(
    docs: DataFrame,
    patterns,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Character-level multi-pattern occurrence counts (OVERLAPPING
    matches included — 'ana' occurs twice in 'banana') via a real
    Aho–Corasick automaton: one pass per document regardless of
    dictionary size.  This is the LARGE-dictionary scale path — the
    automaton builds once on the driver, broadcasts in the task closure,
    and each text is scanned O(len) with failure links; the per-pattern
    expression twin (:func:`multi_pattern_counts_expr`) is O(len·|P|)
    and wins only for tiny pattern sets.  Emits (id, pattern, n_hits)
    for patterns with ≥ 1 hit."""
    import pandas as pd

    from pyspark.sql.types import (
        LongType,
        StringType,
        StructField,
        StructType,
    )

    pats = list(patterns)
    goto, fail, out = aho_corasick_build(pats)
    schema = StructType(
        [
            StructField("id", LongType()),
            StructField("pattern", StringType()),
            StructField("n_hits", LongType()),
        ]
    )

    def gen(batches):
        for pdf in batches:
            rows = []
            for did, text in zip(pdf[id_col], pdf[text_col]):
                if text is None:
                    continue
                counts = _ac_count(str(text), goto, fail, out, len(pats))
                for pi, c in enumerate(counts):
                    if c:
                        rows.append(
                            {"id": int(did), "pattern": pats[pi], "n_hits": c}
                        )
            yield pd.DataFrame(rows, columns=["id", "pattern", "n_hits"])

    return docs.select(F.col(id_col), F.col(text_col)).mapInPandas(gen, schema)


def multi_pattern_counts_expr(
    docs: DataFrame,
    patterns,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """JVM-expression twin of :func:`multi_pattern_counts_ac` for SMALL
    pattern sets: per pattern, count positions p with
    substring(text, p, len) = pattern — overlapping occurrences included,
    zero python, zero shuffle.  Gates the automaton (ac ≡ expr)."""
    t = F.col(text_col)
    arms = []
    for pat in patterns:
        L = len(pat)

        def counter(p_lit: str, ln: int):
            return F.size(
                F.filter(
                    F.sequence(F.lit(1), F.greatest(F.length(t) - ln + 1, F.lit(0))),
                    lambda p: t.substr(p, F.lit(ln)) == p_lit,
                )
            )

        arms.append(
            F.struct(
                F.lit(pat).alias("pattern"),
                counter(pat, L).cast("long").alias("n_hits"),
            )
        )
    return (
        docs.filter(F.col(text_col).isNotNull())
        .select(
            F.col(id_col).alias("id"), F.explode(F.array(*arms)).alias("s")
        )
        .select("id", F.col("s.pattern").alias("pattern"), F.col("s.n_hits").alias("n_hits"))
        .filter(F.col("n_hits") > 0)
    )


def _rake_phrases(text: Column, stopwords: list[str] | None = None) -> Column:
    """array<array<string>> of RAKE candidate phrases: maximal runs of
    content tokens between delimiters (stopwords or non-[a-z]+ tokens),
    built by ONE in-row JVM aggregate fold — no per-doc window, no shuffle.
    State = struct(done: array<array<string>>, cur: array<string>); a
    delimiter flushes cur, the finish lambda flushes the tail run."""
    stops = F.array(*[F.lit(w) for w in (stopwords or LANG_STOPWORDS["en"])])

    def fold(toks: Column) -> Column:
        init = F.struct(
            F.expr("CAST(array() AS array<array<string>>)").alias("done"),
            F.expr("CAST(array() AS array<string>)").alias("cur"),
        )

        def step(acc: Column, x: Column) -> Column:
            is_delim = ~x.rlike("^[a-z]+$") | F.array_contains(stops, x)
            flushed = F.when(
                F.size(acc["cur"]) > 0, F.concat(acc["done"], F.array(acc["cur"]))
            ).otherwise(acc["done"])
            return F.when(
                is_delim,
                F.struct(
                    flushed.alias("done"),
                    F.expr("CAST(array() AS array<string>)").alias("cur"),
                ),
            ).otherwise(
                F.struct(
                    acc["done"].alias("done"), F.concat(acc["cur"], F.array(x)).alias("cur")
                )
            )

        def finish(acc: Column) -> Column:
            return F.when(
                F.size(acc["cur"]) > 0, F.concat(acc["done"], F.array(acc["cur"]))
            ).otherwise(acc["done"])

        return F.aggregate(toks, init, step, finish)

    return bound(F.split(F.lower(F.trim(text)), r"\s+"), fold)


def rake_keyphrases(
    df: DataFrame,
    text_col: str = "text",
    stopwords: list[str] | None = None,
    top_k: int = 30,
    scale: int = 10_000,
) -> DataFrame:
    """RAKE keyphrase extraction (Rose et al. 2010, "Automatic Keyword
    Extraction from Individual Documents"): candidate phrases are maximal
    stopword/punctuation-free token runs; word score = deg(w)/freq(w) where
    freq counts occurrences inside candidates and deg sums the lengths of
    the phrases each occurrence sits in; phrase score = Σ word scores over
    the phrase's token instances.

    Exact-integer contract (the dirichlet_ql_rank pattern): the per-word
    ratio floors to ``(deg*scale) div freq`` BEFORE the phrase sum, so both
    engines sum identical integers.  Scale: segmentation is one zero-shuffle
    JVM fold per doc; word stats aggregate vocab-sized; the phrase score
    joins DISTINCT phrases (not occurrences) against the vocab-sized word
    table.  Output: top_k (phrase, n_words, n_occurrences, score_i) by
    (score_i desc, phrase)."""
    phrases = df.select(
        F.explode(_rake_phrases(F.col(text_col), stopwords)).alias("ph")
    )
    occ = phrases.select(
        F.array_join("ph", " ").alias("phrase"), F.size("ph").alias("plen")
    )
    words = phrases.select(F.explode("ph").alias("w"), F.size("ph").alias("plen"))
    wstats = words.groupBy("w").agg(
        F.count(F.lit(1)).alias("freq"), F.sum("plen").cast("long").alias("deg")
    )
    wscore = wstats.select(
        "w",
        F.expr(f"CAST(({int(scale)} * deg) div freq AS BIGINT)").alias("wscore_i"),
    )
    dphr = occ.groupBy("phrase").agg(F.count(F.lit(1)).cast("long").alias("n_occurrences"))
    scored = (
        dphr.select(
            "phrase", "n_occurrences", F.explode(F.split("phrase", " ")).alias("w")
        )
        .join(wscore, "w")
        .groupBy("phrase", "n_occurrences")
        .agg(F.sum("wscore_i").cast("long").alias("score_i"), F.count(F.lit(1)).alias("nw"))
        .select(
            "phrase",
            F.col("nw").cast("long").alias("n_words"),
            "n_occurrences",
            "score_i",
        )
    )
    return scored.orderBy(F.desc("score_i"), "phrase").limit(top_k)
