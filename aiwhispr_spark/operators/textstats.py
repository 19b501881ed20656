"""Text analysis for training-data curation: language-ID, quality scores,
token counts, fingerprints.  All pure Spark expressions (whole-stage codegen;
zero Python in the hot path) so they run at scan speed over 100 TB.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.udfs import bound

# tiny per-language stopword evidence sets (ASCII-safe subsets of the kernel
# lists in kernels.py so SQL engines agree byte-for-byte)
LANG_STOPWORDS = {
    "en": ["the", "and", "of", "to", "is", "in", "that", "it", "was", "for"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "mit", "ein", "eine", "den"],
    "fr": ["le", "la", "les", "et", "est", "dans", "pour", "que", "une", "des"],
    "es": ["el", "la", "los", "las", "es", "en", "que", "una", "por", "con"],
}


def _tokens(col: Column) -> Column:
    return F.split(F.lower(F.trim(col)), r"\s+")


def lang_id_expr(col: Column) -> Column:
    """Heuristic language-ID: the language with the most stopword hits;
    ties and zero evidence → 'en' (mirrors kernels.detect_sentence_lang).
    NULL text ≡ '' (zero evidence → 'en') — without the coalesce the NULL
    propagates through every score and the when-chain falls through to an
    arbitrary arm (the r5 NULL-injection finding: Spark 'en' vs oracle
    'fr')."""
    col = F.coalesce(col, F.lit(""))
    toks = _tokens(col)
    scores = {
        lang: F.size(F.array_intersect(F.array_distinct(toks), F.array(*[F.lit(w) for w in words])))
        for lang, words in LANG_STOPWORDS.items()
    }
    best = F.greatest(*scores.values())
    result = F.lit("en")
    # later whens take precedence in reverse build order: check non-en langs
    # in reverse-alpha so alphabetical order wins ties after 'en'
    for lang in sorted((l for l in scores if l != "en"), reverse=True):
        result = F.when((scores[lang] == best) & (best > 0), F.lit(lang)).otherwise(result)
    result = F.when((scores["en"] == best) & (best > 0), F.lit("en")).otherwise(result)
    return F.when(best == 0, F.lit("en")).otherwise(result)


def token_count_expr(col: Column) -> Column:
    """Whitespace token count.  NULL text ≡ '' → 0 (F.size of a NULL split
    is -1, which would silently leak into every downstream ratio)."""
    t = F.trim(F.coalesce(col, F.lit("")))
    return F.when(F.length(t) == 0, F.lit(0)).otherwise(F.size(F.split(t, r"\s+")))


def bpe_ish_token_count_expr(col: Column) -> Column:
    """BPE-ish subword proxy: count of letter-runs, digit-runs, and individual
    punctuation marks — the standard cheap stand-in for tokenizer cost.
    NULL text ≡ '' → 0."""
    return F.size(
        F.regexp_extract_all(
            F.coalesce(col, F.lit("")),
            F.lit(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"),
            F.lit(0),
        )
    )


def quality_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Quality-scoring features: length, token count, mean word length,
    punctuation ratio, stopword ratio, uppercase ratio, and a composite
    [0,1] quality score (heuristics in the C4/Gopher-rules family).
    NULL text ≡ '' (all-zero features), keeping every feature column
    non-null — the epoch-allocation/linededup NULL-visibility contract."""
    c = F.coalesce(F.col(text_col), F.lit(""))
    toks = _tokens(c)
    n_tok = token_count_expr(c)
    n_chars = F.length(c)
    punct = F.length(F.regexp_replace(c, r"[^.,;:!?'\"()\[\]{}]", ""))
    upper = F.length(F.regexp_replace(c, r"[^A-Z]", ""))
    stop_hits = F.size(
        F.array_intersect(
            F.array_distinct(toks), F.array(*[F.lit(w) for w in LANG_STOPWORDS["en"]])
        )
    )
    out = (
        df.withColumn("n_chars_calc", n_chars)
        .withColumn("n_tokens", n_tok)
        .withColumn(
            "mean_word_len",
            F.when(n_tok > 0, (n_chars - (n_tok - 1)) / n_tok).otherwise(F.lit(0.0)),
        )
        .withColumn(
            "punct_ratio", F.when(n_chars > 0, punct / n_chars).otherwise(F.lit(0.0))
        )
        .withColumn(
            "upper_ratio", F.when(n_chars > 0, upper / n_chars).otherwise(F.lit(0.0))
        )
        .withColumn(
            "stopword_ratio",
            F.when(n_tok > 0, stop_hits / F.lit(len(LANG_STOPWORDS["en"]))).otherwise(F.lit(0.0)),
        )
    )
    score = (
        F.least(F.col("n_tokens") / 100.0, F.lit(1.0)) * 0.4
        + F.col("stopword_ratio") * 0.4
        + (F.lit(1.0) - F.least(F.col("punct_ratio") * 5.0, F.lit(1.0))) * 0.2
    )
    return out.withColumn("quality_score", F.round(score, 6))


def dup_line_frac_expr(col: Column, sep: str = "\n") -> Column:
    """Gopher-rule repetition signal: fraction of characters living in lines
    that occur MORE THAN ONCE in the document (duplicate-line character
    fraction).  Pure nested-lambda expressions (O(L²) per doc over its line
    list — lines per doc are bounded; the corpus-wide analogue for
    cross-document lines is explode + groupBy count).  `sep` is a LITERAL
    separator (regex-escaped before the split)."""
    import re as _re

    lines_expr = F.filter(F.split(col, _re.escape(sep)), lambda x: x != "")

    # `lines` must be a bound lambda variable: captured in the inner filter
    # body it would re-run the split per line — O(lines × doc_chars) on top
    # of the intended O(L²) count (see functions.udfs.bound)
    def frac(lines: Column) -> Column:
        dup_chars = F.aggregate(
            F.transform(
                lines,
                lambda x: F.when(
                    F.size(F.filter(lines, lambda y: y == x)) > 1, F.length(x)
                ).otherwise(F.lit(0)),
            ),
            F.lit(0).cast("long"),
            lambda acc, v: acc + v,
        )
        total_chars = F.aggregate(
            F.transform(lines, lambda x: F.length(x)),
            F.lit(0).cast("long"),
            lambda acc, v: acc + v,
        )
        return F.when(total_chars > 0, dup_chars / total_chars).otherwise(F.lit(0.0))

    return bound(lines_expr, frac)


def top_bigram_frac_expr(col: Column, max_tokens: int = 200) -> Column:
    """Gopher-rule repetition signal: occurrences of the most frequent token
    bigram / total bigrams.  Token list is capped at `max_tokens` (the signal
    saturates long before that; keeps the O(B²) per-doc count bounded).
    Scale note: this is the map-side per-document form — corpus-wide n-gram
    stats go through explode + groupBy, not this expression."""
    toks_expr = F.slice(F.split(F.lower(F.trim(col)), r"\s+"), 1, max_tokens)
    # bound: element_at(toks, ·) inside the lambda body would re-split the
    # FULL document per bigram (the slice caps the array, not the split)
    bigrams = F.array_sort(
        bound(
            toks_expr,
            lambda toks: F.filter(
                F.transform(
                    toks,
                    lambda _, i: F.when(
                        i + 2 <= F.size(toks),
                        F.concat(
                            F.element_at(toks, i + 1),
                            F.lit(" "),
                            F.element_at(toks, i + 2),
                        ),
                    ),
                ),
                lambda x: x.isNotNull(),
            ),
        )
    )
    # most-frequent count = longest equal run of the SORTED bigram list:
    # O(B log B) instead of the naive O(B²) all-pairs count (measured 60×
    # faster at 200 tokens/doc).  Fold state: (prev, current run, best run).
    # bigrams is also bound — it is referenced by the fold AND two sizes.
    def frac(bg: Column) -> Column:
        run_state = F.aggregate(
            bg,
            F.struct(
                F.lit("").alias("prev"), F.lit(0).alias("run"), F.lit(0).alias("best")
            ),
            lambda st, x: F.struct(
                x.alias("prev"),
                F.when(x == st["prev"], st["run"] + 1).otherwise(F.lit(1)).alias("run"),
                F.greatest(
                    st["best"], F.when(x == st["prev"], st["run"] + 1).otherwise(F.lit(1))
                ).alias("best"),
            ),
        )
        top = run_state["best"]
        return F.when(F.size(bg) > 0, top / F.size(bg)).otherwise(F.lit(0.0))

    return bound(bigrams, frac)


def fingerprint_expr(col: Column) -> Column:
    """Deterministic 64-bit-ish document fingerprint: md5 → first 15 hex chars
    → bigint.  Content-derived and engine-portable (md5 exists in Spark,
    DuckDB, Trino) — the distributed stand-in for a rolling hash.
    NULL text ≡ '' (fingerprints md5('') rather than emitting a NULL key
    that every downstream groupBy would silently segregate)."""
    return F.conv(
        F.substring(F.md5(F.coalesce(col, F.lit(""))), 1, 15), 16, 10
    ).cast("long")


def hashed_linear_scores(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 4096,
    threshold_i: int = 0,
) -> DataFrame:
    """fastText-style hashed linear quality classifier (the standard web-scale
    keep/drop model shape: CCNet's fastText filter, GPT-3's WebText-vs-Common-
    Crawl logistic regression).  Each token is feature-hashed into one of
    ``n_buckets`` buckets; the document score is the sum of the bucket weights;
    ``keep`` is a threshold on the mean weight.

    The bucket→weight table is the MODEL.  In production it comes from
    training and is a broadcast array of ``n_buckets`` floats; in this sandbox
    (no trainable model, no network) the weights are synthesized in closed
    form from the bucket id — ``w(b) = (b·2654435761 mod 2001) − 1000``, an
    integer in [−1000, 1000] representing thousandths — so the full
    hash→bucket→weight→aggregate dataflow is real and cross-engine testable
    while the weights stay deterministic.  Swap ``weight_of_bucket`` to plug a
    trained table in.

    Returns (id_col, n_tokens, score_i, keep_i): ``score_i`` the integer
    weight sum (thousandths), ``keep_i`` 1 iff score_i ≥ threshold_i·n_tokens
    (integer cross-multiply — no float division anywhere).

    100 TB shape: ZERO shuffles and zero Python — tokenize/hash/weight/sum is
    one ``transform``+``aggregate`` expression chain per row, entirely inside
    whole-stage codegen, so the classifier runs at scan speed.  A trained
    weight table of 2M buckets × 4 bytes is ~8 MB: broadcast, never joined.
    """
    toks = F.filter(
        F.split(F.lower(F.col(text_col)), r"\s+"), lambda t: t != F.lit("")
    )

    def weight_of_bucket(b: Column) -> Column:
        # closed-form stand-in for a trained weight table lookup
        return (b * F.lit(2654435761)) % F.lit(2001) - F.lit(1000)

    def bucket_of_token(t: Column) -> Column:
        return F.conv(F.substring(F.md5(t), 1, 8), 16, 10).cast("long") % F.lit(
            n_buckets
        )

    weights = F.transform(toks, lambda t: weight_of_bucket(bucket_of_token(t)))
    score = F.aggregate(weights, F.lit(0).cast("long"), lambda a, x: a + x)
    return docs.select(
        F.col(id_col),
        F.size(toks).cast("long").alias("n_tokens"),
        score.alias("score_i"),
        (score >= F.lit(threshold_i).cast("long") * F.size(toks).cast("long"))
        .cast("long")
        .alias("keep_i"),
    )


def unigram_logprob_scores(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Perplexity-proxy quality score: per-document sum of unigram log-probs
    under the corpus's OWN unigram distribution (the KenLM-style wellformedness
    signal of CCNet, with the corpus itself as the model — no external LM in
    the sandbox).  Lower sum/n_tokens ⇒ rarer words ⇒ likelier junk.

    Returns (id_col, n_tokens, sum_logp_i) where ``sum_logp_i`` is the sum of
    per-token ``round(1e6·ln(cnt/total))`` BIGINTs: rounding each token's
    log-prob to a scaled int BEFORE summing makes the aggregate exactly
    order-independent — a float sum would pick up shuffle-order low-bit noise
    and break cross-engine hash gates (mean = sum_logp_i / 1e6 / n_tokens,
    derived by the consumer).

    100 TB shape: two shuffles total — the vocab groupBy on token and the
    token⇄vocab hash join (both key on the token string; the vocab side is
    count-sized, not corpus-sized) — then the per-doc groupBy combines
    map-side.  Only the 1-row corpus total is broadcast; the vocab itself is
    joined, never collected, so an open-vocab web corpus never pressures the
    driver."""
    toks = docs.select(
        F.col(id_col).alias("_id"),
        F.explode(F.split(F.lower(F.col(text_col)), r"\s+")).alias("tok"),
    ).filter(F.col("tok") != "")
    counts = toks.groupBy("tok").agg(F.count("*").alias("cnt"))
    # corpus total from the VOCAB-sized aggregate, not a third corpus scan
    total = counts.agg(F.sum("cnt").alias("_total"))
    vocab = counts.crossJoin(F.broadcast(total)).select(
        "tok",
        F.round(F.log(F.col("cnt") / F.col("_total")) * 1e6)
        .cast("bigint")
        .alias("logp_i"),
    )
    return (
        toks.join(vocab, "tok")
        .groupBy("_id")
        .agg(
            F.count("*").cast("long").alias("n_tokens"),
            F.sum("logp_i").alias("sum_logp_i"),
        )
        .withColumnRenamed("_id", id_col)
    )


def bpe_pair_counts(
    docs: DataFrame, text_col: str = "text", top_k: int = 20
) -> DataFrame:
    """The first BPE merge iteration's pair statistics at corpus scale:
    corpus-weighted counts of adjacent CHARACTER pairs within words, the
    quantity a tokenizer trainer maximizes when picking its next merge
    (Sennrich et al. 2016).  Returns the ``top_k`` ``(pair, n)`` rows,
    ordered (n DESC, pair ASC) — the ASC tie-break makes the cut
    deterministic cross-engine.

    100 TB shape: the corpus collapses to its VOCABULARY first (one shuffle
    keyed on the word), so the per-character pair explosion runs over
    distinct words × their counts, not over raw tokens — on web text the
    vocab is orders of magnitude smaller than the token stream.  The pair
    aggregation map-side combines into ≤ |alphabet|² keys and the top-k is
    a TakeOrderedAndProject, never a global sort."""
    words = docs.select(
        F.explode(
            F.filter(
                F.split(F.lower(F.col(text_col)), r"\s+"),
                lambda t: t != F.lit(""),
            )
        ).alias("w")
    )
    vocab = words.groupBy("w").agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    # guard: sequence(1, 0) counts DOWN, not empty — 1-char words must yield
    # an empty pair list explicitly (same trap as decontam._doc_ngrams)
    pairs = vocab.select(
        F.explode(
            F.expr(
                "CASE WHEN length(w) >= 2"
                " THEN transform(sequence(1, length(w) - 1),"
                "                i -> substring(w, i, 2))"
                " ELSE array() END"
            )
        ).alias("pair"),
        "cnt",
    )
    return (
        pairs.groupBy("pair")
        .agg(F.sum("cnt").alias("n"))
        .orderBy(F.desc("n"), F.asc("pair"))
        .limit(top_k)
    )


def compression_ratios(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id", level: int = 6
) -> DataFrame:
    """Gopher/CCNet compressibility quality signal: zlib-compressed size /
    raw size per document.  Highly compressible ⇒ repetitive/templated text
    (spam, keyword stuffing); near-incompressible ⇒ often binary junk that
    leaked past extraction.  Thresholds on both tails are standard filters.

    Returns (id_col, n_bytes, n_compressed, ratio_i) with ``ratio_i =
    round(1e4 · compressed/raw)`` (0 for empty docs).

    This one is genuinely python (no zlib in any SQL engine — also why the
    gate is a pytest golden against the zlib reference, not a DuckDB twin):
    ``mapInPandas`` with Arrow batches, compression runs per batch with zero
    per-row python overhead beyond the codec itself; the stage is narrow
    (no shuffle) and composes with the scan."""
    import pandas as pd  # noqa: F401 — imported for the worker closure

    out_schema = f"{id_col} long, n_bytes long, n_compressed long, ratio_i long"

    def _batches(it):
        import zlib

        import pandas as pd

        for pdf in it:
            raw = pdf[text_col].fillna("").map(lambda s: s.encode("utf-8"))
            n_bytes = raw.map(len)
            n_comp = raw.map(lambda b: len(zlib.compress(b, level)))
            ratio = [
                int(round(10000.0 * c / b)) if b > 0 else 0
                for b, c in zip(n_bytes, n_comp)
            ]
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "n_bytes": n_bytes.astype("int64"),
                    "n_compressed": n_comp.astype("int64"),
                    "ratio_i": ratio,
                }
            )

    return docs.select(id_col, text_col).mapInPandas(_batches, out_schema)


def dsir_importance_weights(
    raw_docs: DataFrame,
    target_docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 4096,
) -> DataFrame:
    """DSIR importance weights (Xie et al. 2023, "Data Selection for Language
    Models via Importance Resampling"): score every raw-corpus document by how
    target-like its hashed-unigram distribution is, ``w(doc) = Σ_tokens
    log(p_target(b)/p_raw(b))`` over feature-hash buckets ``b`` — the
    standard recipe for selecting web text that resembles a curated corpus.
    Resample/top-k by weight downstream (compose with
    ``packing.stratified_sample`` or a plain orderBy-limit).

    Buckets use the same md5 feature hash as :func:`hashed_linear_scores`
    (cross-engine reproducible); both distributions are Laplace-smoothed
    ``(cnt+1)/(total+B)``.  The per-bucket log-ratio is computed as
    ``ln(cnt_t+1) − ln(total_t+B) − ln(cnt_r+1) + ln(total_r+B)`` — a fixed
    left-associated chain of doubles (bit-identical across engines, and no
    BIGINT product that would overflow at web-scale token totals) — then
    rounded to ``lr_i = round(1e6·lr)`` BEFORE the per-document sum, making
    the aggregate exactly order-independent (the unigram_logprob_scores
    discipline).

    Returns (id_col, n_tokens, weight_i) for every raw doc with ≥1 token.

    100 TB shape: the bucket table is ≤ ``n_buckets`` rows regardless of
    corpus size — it broadcasts onto the token stream; two token-keyed
    aggregations (raw + target) and one per-doc groupBy are the only
    shuffles, each map-side combined.  The target corpus is typically
    orders of magnitude smaller than raw; nothing here collects to the
    driver."""

    def _bucket(t):
        return F.conv(F.substring(F.md5(t), 1, 8), 16, 10).cast("long") % F.lit(
            n_buckets
        )

    def _toks(df, keep_id: bool):
        cols = [F.col(id_col).alias("_id")] if keep_id else []
        t = df.select(
            *cols,
            F.explode(F.split(F.lower(F.col(text_col)), r"\s+")).alias("tok"),
        ).filter(F.col("tok") != "")
        return t.withColumn("bucket", _bucket(F.col("tok")))

    raw_toks = _toks(raw_docs, keep_id=True)
    tgt_toks = _toks(target_docs, keep_id=False)

    raw_cnt = raw_toks.groupBy("bucket").agg(F.count("*").alias("cnt_r"))
    tgt_cnt = tgt_toks.groupBy("bucket").agg(F.count("*").alias("cnt_t"))
    raw_total = raw_cnt.agg(F.sum("cnt_r").alias("total_r"))
    tgt_total = tgt_cnt.agg(F.sum("cnt_t").alias("total_t"))

    buckets = (
        raw_cnt.join(tgt_cnt, "bucket", "full_outer")
        .na.fill({"cnt_r": 0, "cnt_t": 0})
        .crossJoin(F.broadcast(raw_total))
        .crossJoin(F.broadcast(tgt_total))
    )
    b = F.lit(float(n_buckets))
    lr = (
        F.log(F.col("cnt_t") + F.lit(1.0))
        - F.log(F.col("total_t") + b)
        - F.log(F.col("cnt_r") + F.lit(1.0))
        + F.log(F.col("total_r") + b)
    )
    lr_table = buckets.select(
        "bucket", F.round(lr * 1e6).cast("bigint").alias("lr_i")
    )

    return (
        raw_toks.join(F.broadcast(lr_table), "bucket")
        .groupBy("_id")
        .agg(
            F.count("*").cast("long").alias("n_tokens"),
            F.sum("lr_i").alias("weight_i"),
        )
        .withColumnRenamed("_id", id_col)
    )


def _bpe_word_array(text_col: str) -> Column:
    """Lowercased whitespace tokens with C0 controls scrubbed first (Java's
    \\s misses \\x1e/\\x1f, which the pair/separator encoding reserves)."""
    return F.filter(
        F.split(
            F.lower(F.regexp_replace(F.col(text_col), "[\\x00-\\x1f]", " ")),
            r"\s+",
        ),
        lambda t: t != F.lit(""),
    )


def _bpe_merge_fold(syms: Column, x: str, y: str) -> Column:
    """One greedy left-to-right merge pass of pair (x, y) over a symbol
    array, as a JVM aggregate fold (equivalent to the textbook pass: a
    just-created symbol never re-matches as the LEFT of the same pair
    because it is the concat, not the left part)."""
    from ..functions.udfs import bound

    return bound(
        syms,
        lambda s: F.aggregate(
            F.slice(s, 2, F.size(s) - 1),
            F.slice(s, 1, 1),
            lambda acc, cur: F.when(
                (F.element_at(acc, -1) == F.lit(x)) & (cur == F.lit(y)),
                F.concat(F.slice(acc, 1, F.size(acc) - 1), F.array(F.lit(x + y))),
            ).otherwise(F.concat(acc, F.array(cur))),
        ),
    )


def bpe_train(
    docs: DataFrame,
    n_merges: int = 5,
    text_col: str = "text",
) -> DataFrame:
    """Full BPE merge training (Sennrich et al. 2016), ``n_merges`` rounds:
    the corpus collapses to its weighted VOCABULARY once, every word becomes
    its character-symbol sequence, then each round (a) counts adjacent
    symbol pairs corpus-weighted, (b) picks the most frequent (ties → the
    lexicographically smaller pair), and (c) greedily left-to-right merges
    that pair inside every word.  Returns the merge table
    ``(step, x, y, merged, n)`` — the artifact a tokenizer ships.

    Implemented as :func:`bpe_train_batched` at ``batch_m=1`` (whose
    selection rules provably reduce to the per-round argmax) so the two
    trainers cannot drift — the equality gates in
    tests/test_graph_analytics.py pin the reduction."""
    return bpe_train_batched(docs, n_merges=n_merges, text_col=text_col, batch_m=1)


def bpe_train_batched(  # noqa: C901
    docs: DataFrame,
    n_merges: int = 5,
    text_col: str = "text",
    batch_m: int = 8,
    batch_log: list | None = None,
) -> DataFrame:
    """BPE merge training with up to ``batch_m`` merges applied per Spark
    round — collapses :func:`bpe_train`'s one-job-per-merge wall-clock
    (VERDICT r3: a production 32k-merge vocabulary is 32k sequential jobs ×
    the ~250 ms/job floor) to ~``n_merges / batch_m`` rounds while emitting
    EXACTLY the sequential merge table.

    Batch selection per round, from the (count desc, pair asc)-ordered
    top-K pair list:

    1. **Safe prefix**: walk in order, keeping pairs while each new pair's
       members are disjoint from every kept pair's {x, y, x+y}; STOP at the
       first conflict (a conflicting pair is one whose count sequential
       training could re-rank mid-round).
    2. **Conflict margin**: let C = max over (a) counts of candidates
       anywhere in the list that conflict with the FINAL kept set, (b) the
       count at the stop position, (c) the last collected count when the
       list is full (bounds everything below the collection horizon).
       Keep only pairs with count > 3·C.

    Why 3·C makes batched ≡ sequential (docstring-proof):

    - Kept counts are invariant within the round: a kept adjacency is
      destroyed only by a merge consuming its members (excluded by 1) and
      created only where a new symbol equals a kept member (excluded by 1).
    - A non-kept OLD pair never out-ranks a kept pair at its original
      count: the kept set is a count-ordered prefix, and the (count desc,
      pair asc) tie-break is the same order sequential uses.
    - A non-kept pair can GAIN count mid-round only via occurrences
      "… x y c …" of a kept merge (x, y): each such gain ≤ count(y, c),
      and (y, c) shares y with the kept pair, so the donor is a conflicting
      candidate (or below the horizon) with count ≤ C.  A pair has two
      members, so at most two such boosts; with its original count also
      ≤ C (it conflicts, or sits below the horizon), any boosted count is
      ≤ 3·C < every kept count — strictly, so ties are impossible.
    - Brand-NEW pairs (involving a just-created symbol) have count ≤ their
      donor's ≤ C.

    Sequential training therefore picks exactly kept[0], kept[1], … within
    the round.  If the margin empties the batch, the round falls back to
    the plain argmax — which IS the sequential step — so ``batch_m=1`` and
    every degenerate round reduce to :func:`bpe_train` exactly.

    100 TB shape: identical to :func:`bpe_train` (vocab-sized rounds, one
    corpus scan) with the driver-side job count divided by the realized
    batch size; a round's merge passes chain as ONE select of nested JVM
    folds (order-free by member-disjointness)."""
    from ..functions.udfs import bound

    words = docs.select(F.explode(_bpe_word_array(text_col)).alias("w"))
    vocab = words.groupBy("w").agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    state = vocab.select(
        "cnt",
        F.expr("transform(sequence(1, length(w)), i -> substring(w, i, 1))").alias(
            "syms"
        ),
    ).localCheckpoint()
    sep = "\x1f"
    merges = []
    prev = state
    while len(merges) < n_merges:
        pair_arr = bound(
            F.col("syms"),
            lambda s: F.zip_with(
                F.slice(s, 1, F.size(s) - 1),
                F.slice(s, 2, F.size(s) - 1),
                lambda a, b: F.concat(a, F.lit(sep), b),
            ),
        )
        room = n_merges - len(merges)
        top_k = max(4 * batch_m + 8, 16)
        cand = (
            prev.select(F.explode(pair_arr).alias("pair"), "cnt")
            .groupBy("pair")
            .agg(F.sum("cnt").cast("long").alias("n"))
            .orderBy(F.desc("n"), F.asc("pair"))
            .limit(top_k)
            .collect()
        )
        if not cand:
            break
        pairs = [
            (r["pair"].split(sep)[0], r["pair"].split(sep)[1], r["n"]) for r in cand
        ]
        kept = []
        kept_syms: set = set()
        stop_count = 0
        for x, y, n in pairs:
            if len(kept) >= min(batch_m, room) or ({x, y} & kept_syms):
                stop_count = n
                break
            kept.append((x, y, n))
            kept_syms |= {x, y, x + y}
        c_bound = stop_count
        if len(pairs) == top_k:
            c_bound = max(c_bound, pairs[-1][2])
        for x, y, n in pairs:
            if (x, y) not in [(kx, ky) for kx, ky, _ in kept] and ({x, y} & kept_syms):
                c_bound = max(c_bound, n)
        kept = [(x, y, n) for (x, y, n) in kept if n > 3 * c_bound]
        if not kept:
            kept = [pairs[0]]  # argmax fallback — exactly the sequential step
        merged = F.col("syms")
        for x, y, _n in kept:
            merged = _bpe_merge_fold(merged, x, y)
        if batch_log is not None:
            batch_log.append(len(kept))  # realized batch size this round
        for x, y, n in kept:
            merges.append((len(merges) + 1, x, y, x + y, n))
        # localCheckpoint per round (see bpe_train) — truncates the nested
        # fold-expression chain that OOMs analysis past ~40 rounds
        nxt = prev.select("cnt", merged.alias("syms")).localCheckpoint()
        prev = nxt
    spark = docs.sparkSession
    return spark.createDataFrame(
        merges, "step int, x string, y string, merged string, n long"
    )


def bpe_encode(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Tokenize the corpus under a TRAINED merge table: (doc_id, token, n)
    — the encode half of the BPE tokenizer (:func:`bpe_train` is the train
    half; its collected (x, y) rows, in step order, are this argument —
    merge tables are driver state in every shipped tokenizer).

    The corpus is tokenized VOCABULARY-first: DISTINCT words run the merge
    fold chain once, then per-doc word counts join the word→tokens table —
    the fold never executes per occurrence, so cost scales with |vocab|,
    not corpus size.

    100 TB shape: one map-side-combinable shuffle collapses (doc, word)
    counts; the fold chain is pure JVM expression work over vocab-sized
    rows; the token join is co-keyed on the word (broadcast when the vocab
    is small); the final per-doc aggregate is map-side combinable."""
    doc_words = (
        docs.select(
            F.col(id_col).alias("doc_id"),
            F.explode(_bpe_word_array(text_col)).alias("w"),
        )
        .groupBy("doc_id", "w")
        .agg(F.count(F.lit(1)).cast("long").alias("n_w"))
    )
    syms: Column = F.expr(
        "transform(sequence(1, length(w)), i -> substring(w, i, 1))"
    )
    for x, y in merges:
        syms = _bpe_merge_fold(syms, x, y)
    vocab_tokens = doc_words.select("w").distinct().select("w", syms.alias("toks"))
    return (
        doc_words.join(vocab_tokens, "w")
        .select("doc_id", F.explode("toks").alias("token"), "n_w")
        .groupBy("doc_id", "token")
        .agg(F.sum("n_w").cast("long").alias("n"))
    )


_SCRIPT_RANGES = [
    ("latin", r"[A-Za-zÀ-ɏ]"),
    ("cyrillic", r"[Ѐ-ӿ]"),
    ("greek", r"[Ͱ-Ͽ]"),
    ("arabic", r"[؀-ۿ]"),
    ("cjk", r"[぀-ヿ一-鿿가-힯]"),
]


def script_profile(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-document Unicode-script profile: (doc_id, n_latin, n_cyrillic,
    n_greek, n_arabic, n_cjk, main_script) — the writing-system signal a
    multilingual curation pipeline routes on (which lang-ID model to run,
    which tokenizer, which quality thresholds).  ``main_script`` is the
    argmax with a fixed precedence tie-break (the _SCRIPT_RANGES order;
    'none' when every count is zero).

    Ranges are the curation-relevant basic blocks (Latin incl. the two
    supplement blocks, Cyrillic, Greek, Arabic, CJK incl. kana + hangul) —
    not full Unicode script property classes (Java and RE2 disagree on
    those; explicit ranges behave identically everywhere).

    100 TB shape: pure JVM ``regexp_count`` expressions fused with the
    scan — no python stage, no exchange (plan-asserted)."""
    counts = [
        F.regexp_count(F.col(text_col), F.lit(rx)).cast("long").alias(f"n_{name}")
        for name, rx in _SCRIPT_RANGES
    ]
    out = docs.select(F.col(id_col).alias("doc_id"), *counts)
    main = F.lit("none")
    # build the precedence chain back-to-front: earlier scripts win ties
    for name, _ in reversed(_SCRIPT_RANGES):
        ge_all = F.col(f"n_{name}") > 0
        for o, _ in _SCRIPT_RANGES:
            if o != name:
                ge_all = ge_all & (F.col(f"n_{name}") >= F.col(f"n_{o}"))
        main = F.when(ge_all, F.lit(name)).otherwise(main)
    return out.withColumn("main_script", main)


def bigram_logprob_scores(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Context-aware perplexity proxy: per-document sum of add-one-smoothed
    BIGRAM log-probs under the corpus's own bigram distribution —
    ``p(b|a) = (c(ab)+1) / (c(a·)+V)`` with ``c(a·)`` the left-context total
    and ``V`` the unigram vocabulary size.  The unigram twin
    (:func:`unigram_logprob_scores`) scores word rarity; this one scores
    word ORDER — shuffled text keeps its unigram score but craters here,
    which is exactly the word-salad signal CCNet's KenLM filter carries.

    Same integer discipline as the unigram scorer: each bigram TYPE's
    log-prob rounds to ``round(1e6·ln(p))`` once, per-doc sums are BIGINT —
    order-independent, cross-engine hash-gateable.  Docs with < 2 tokens
    score (0, 0).

    100 TB shape: the corpus collapses to its BIGRAM vocabulary (one
    shuffle keyed on the bigram); left-context totals aggregate from that
    vocab table, not the corpus; V and nothing else is a 1-row broadcast;
    the doc⇄model join keys on the bigram string."""
    from ..functions.udfs import bound

    toks_expr = F.filter(
        F.split(F.lower(F.trim(F.col(text_col))), r"\s+"), lambda t: t != ""
    )
    # guard: slice(t, 1, size-1) gets length -1 on a zero-token doc and
    # Spark ABORTS (INVALID_PARAMETER_VALUE.LENGTH) — empty/whitespace-only
    # docs must yield an empty bigram list, like the oracle's CASE len>=2
    bigram_arr = bound(
        toks_expr,
        lambda t: F.when(
            F.size(t) >= 2,
            F.zip_with(
                F.slice(t, 1, F.size(t) - 1),
                F.slice(t, 2, F.size(t) - 1),
                lambda a, b: F.concat(a, F.lit(" "), b),
            ),
        ).otherwise(F.array().cast("array<string>")),
    )
    base = docs.select(F.col(id_col).alias("_id"), bigram_arr.alias("bg"))
    big = base.select("_id", F.explode("bg").alias("bigram"))
    counts = big.groupBy("bigram").agg(F.count(F.lit(1)).alias("cab"))
    left_tot = counts.select(
        F.split(F.col("bigram"), " ").getItem(0).alias("a"), "cab"
    ).groupBy("a").agg(F.sum("cab").alias("ca"))
    vsize = (
        docs.select(F.explode(toks_expr).alias("tok"))
        .agg(F.countDistinct("tok").alias("v"))
    )
    model = (
        counts.withColumn("a", F.split(F.col("bigram"), " ").getItem(0))
        .join(left_tot, "a")
        .crossJoin(F.broadcast(vsize))
        .select(
            "bigram",
            F.round(F.log((F.col("cab") + 1) / (F.col("ca") + F.col("v"))) * 1e6)
            .cast("bigint")
            .alias("logp_i"),
        )
    )
    scored = (
        big.join(model, "bigram")
        .groupBy("_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_bigrams"),
            F.sum("logp_i").alias("sum_logp_i"),
        )
    )
    return (
        docs.select(F.col(id_col).alias("_id"))
        .join(scored, "_id", "left")
        .select(
            F.col("_id").alias(id_col),
            F.coalesce("n_bigrams", F.lit(0)).cast("long").alias("n_bigrams"),
            F.coalesce("sum_logp_i", F.lit(0)).cast("long").alias("sum_logp_i"),
        )
    )


def readability_scores(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Flesch readability signals per document — the classic grade-level /
    reading-ease pair used as an LLM-corpus quality facet (too-hard legalese
    and too-trivial listicles both get mixed away; complements the
    length/stopword features in :func:`quality_features`).

    Documented counting subset (both engines run the byte-same rules):

    * words      = whitespace-delimited non-empty tokens;
    * sentences  = runs of ``[.!?]+``, floored at 1;
    * syllables  = per word, ``max(1, number of [aeiouy]+ vowel groups)`` of
      the lowercased token — the standard dictionary-free approximation
      (silent-e / diphthong corrections are out of scope and documented so).

    Integer discipline: both scores are scaled-1e6 BIGINTs computed with
    integer ``div`` only — fk_grade_i = 0.39·(w/s) + 11.8·(syll/w) − 15.59,
    fre_i = 206.835 − 1.015·(w/s) − 84.6·(syll/w) — so Spark and DuckDB agree
    bit-for-bit (no float ratios).  Wordless docs emit NULL scores.

    100 TB shape: one narrow pure-JVM expression stage over the text column —
    zero shuffle, zero python, fused into whole-stage codegen with the scan.
    NULL text ≡ '' → wordless → NULL scores (the documented wordless rule).
    """
    t = F.coalesce(F.col(text_col), F.lit(""))
    words = F.filter(F.split(F.lower(t), r"\s+"), lambda w: w != "")
    n_words = F.size(words).cast("long")
    n_sentences = F.greatest(
        F.lit(1).cast("long"),
        F.size(F.regexp_extract_all(t, F.lit(r"[.!?]+"), F.lit(0))).cast("long"),
    )
    n_syll = F.aggregate(
        words,
        F.lit(0).cast("long"),
        lambda acc, w: acc
        + F.greatest(
            F.lit(1),
            F.size(F.regexp_extract_all(w, F.lit(r"[aeiouy]+"), F.lit(0))),
        ).cast("long"),
    )
    base = docs.select(
        F.col(id_col).alias(id_col),
        n_words.alias("n_words"),
        n_sentences.alias("n_sentences"),
        F.coalesce(n_syll, F.lit(0)).cast("long").alias("n_syllables"),
    )
    w = F.col("n_words")
    fk = (
        F.expr("390000 * n_words div n_sentences")
        + F.expr("11800000 * n_syllables div n_words")
        - F.lit(15590000)
    )
    fre = (
        F.lit(206835000)
        - F.expr("1015000 * n_words div n_sentences")
        - F.expr("84600000 * n_syllables div n_words")
    )
    return base.select(
        id_col,
        "n_words",
        "n_sentences",
        "n_syllables",
        F.when(w > 0, fk).cast("long").alias("fk_grade_i"),
        F.when(w > 0, fre).cast("long").alias("fre_i"),
    )


def declared_lang_mismatch(
    docs: DataFrame,
    url_col: str = "url",
    html_col: str = "html",
) -> DataFrame:
    """Declared-vs-detected language validation (the CCNet consistency
    check): the ``<html lang="…">`` attribute is author metadata and lies
    constantly at web scale (template defaults, copy-pasted headers) —
    routing a page into the wrong language pipeline poisons per-language
    stats, LM scores and dedup.  Compares the declared PRIMARY subtag
    ('en-GB' → 'en') against :func:`lang_id_expr` over the tag-stripped
    visible text.

    Output: (url, declared_lang, detected_lang, has_declared_i, mismatch_i)
    — undeclared pages flag nothing (no evidence ≠ disagreement).

    100 TB shape: attribute pull + tag strip + the stopword vote are one
    narrow JVM expression stage; zero shuffle, zero python.
    """
    text = F.decode(F.col(html_col), "UTF-8")
    # any quote style (double/single/none) and any case, like the sibling
    # attribute extractors; unquoted values end at whitespace or '>'
    declared_full = F.lower(
        F.regexp_extract(
            text, r"(?i)<html[^>]*\slang\s*=\s*[\"']?([A-Za-z][A-Za-z-]*)", 1
        )
    )
    primary = F.regexp_extract(declared_full, r"^([a-z]+)", 1)
    visible = F.regexp_replace(text, r"(?s)<[^>]*>", " ")
    detected = lang_id_expr(visible)
    return docs.select(
        F.col(url_col).alias("url"),
        primary.alias("declared_lang"),
        detected.alias("detected_lang"),
        (primary != "").cast("int").alias("has_declared_i"),
        ((primary != "") & (primary != detected)).cast("int").alias("mismatch_i"),
    )


def vocab_stats(
    docs: DataFrame,
    lang_col: str = "lang",
    text_col: str = "text",
) -> DataFrame:
    """Per-language vocabulary diagnostics — the Zipf/Heaps sanity panel a
    corpus report leads with: token volume, vocabulary size, hapax count
    (Zipf tail mass — a sudden hapax-share jump means OCR junk or encoding
    damage) and the top-10-type share (head mass — a jump means boilerplate
    slipped past dedup).

    Output per language: (lang, n_tokens, vocab_size, hapax_n,
    hapax_share_pm, top10_share_pm) — shares as integer per-mille of tokens.

    100 TB shape: ONE (lang, token) aggregate (map-side combinable,
    vocabulary-sized result), then per-lang rollups over the vocab table —
    the corpus is scanned once; the top-10 cut is a lang-partitioned
    row_number over vocab counts, never a global sort.
    """
    from pyspark.sql.window import Window

    toks = docs.select(
        F.col(lang_col).alias("lang"),
        F.explode(F.split(F.lower(F.col(text_col)), r"\s+")).alias("tok"),
    ).filter(F.col("tok") != "")
    vocab = toks.groupBy("lang", "tok").agg(F.count(F.lit(1)).alias("n"))
    w = Window.partitionBy("lang").orderBy(F.desc("n"), F.asc("tok"))
    ranked = vocab.withColumn("rk", F.row_number().over(w))
    return (
        ranked.groupBy("lang")
        .agg(
            F.sum("n").cast("long").alias("n_tokens"),
            F.count(F.lit(1)).cast("long").alias("vocab_size"),
            F.sum(F.when(F.col("n") == 1, 1).otherwise(0)).cast("long").alias("hapax_n"),
            F.sum(F.when(F.col("rk") <= 10, F.col("n")).otherwise(0))
            .cast("long")
            .alias("_top10"),
        )
        .select(
            "lang",
            "n_tokens",
            "vocab_size",
            "hapax_n",
            F.expr("1000 * hapax_n div n_tokens").cast("long").alias("hapax_share_pm"),
            F.expr("1000 * _top10 div n_tokens").cast("long").alias("top10_share_pm"),
        )
    )


def robust_outliers(
    df,
    value_col: str,
    group_col: str,
    id_col: str,
    k_pm: int = 3500,
):
    """Robust per-group outlier detection (median/MAD — the curation
    statistic that survives the heavy tails z-scores die on): flag rows with
    ``|x − median| > (k_pm/1000) · MAD`` where MAD = median absolute
    deviation within the group.  EXACT integer contract: medians via
    percentile_approx at max accuracy (≡ DuckDB quantile_disc — both pick
    the ceil(p·n)th data point), the threshold as a CROSS-MULTIPLIED
    integer compare (no division), and ``dev_pm = 1000·|x−med| div MAD``
    with the −1 sentinel when MAD = 0 (a zero-spread group flags ANY
    deviation — the cross-multiply handles that case for free).

    Output: (group, id, value, med, mad, dev_pm) for OUTLIER rows only.
    Scale shape: two grouped percentile aggregates (t-digest state, map-side
    combinable) + two broadcastable |groups|-sized joins; the row stream
    never shuffles."""
    from pyspark.sql import functions as F

    acc = F.lit(2147483647)
    d = df.select(
        F.col(group_col).alias("g"),
        F.col(id_col).alias("id"),
        F.col(value_col).cast("long").alias("v"),
    )
    med = d.groupBy("g").agg(
        F.percentile_approx("v", F.lit(0.5), acc).cast("long").alias("med")
    )
    j = d.join(F.broadcast(med), "g").withColumn("adev", F.abs(F.col("v") - F.col("med")))
    mad = j.groupBy("g").agg(
        F.percentile_approx("adev", F.lit(0.5), acc).cast("long").alias("mad")
    )
    out = (
        j.join(F.broadcast(mad), "g")
        .filter(1000 * F.col("adev") > int(k_pm) * F.col("mad"))
        .select(
            F.col("g").alias(group_col),
            F.col("id").alias(id_col),
            F.col("v").alias("value"),
            "med",
            "mad",
            F.expr("CASE WHEN mad > 0 THEN CAST((1000 * adev) div mad AS BIGINT)"
                   " ELSE CAST(-1 AS BIGINT) END").alias("dev_pm"),
        )
    )
    return out


def gopher_rules(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_words: int = 50,
    max_words: int = 100_000,
) -> DataFrame:
    """Gopher-style repetition-free quality rule panel (Rae et al. 2021,
    "Scaling Language Models", Table A1) — the other canonical web-corpus
    keep/drop ruleset next to the C4 chain (``clean_corpus_filters``): word
    count in [min_words, max_words], mean word length in [3, 10], symbol
    ("#", "...", "…") to word ratio ≤ 0.1, ≤ 90% of lines bullet-started,
    ≤ 30% of lines ellipsis-ended, ≥ 80% of words containing a letter, and
    ≥ 2 distinct stopwords from the canonical 8-word set.

    Determinism discipline: every ratio is an INTEGER cross-multiplication
    (sym·10 ≤ words, alpha·10 ≥ words·8, …) — no float ever exists, so the
    DuckDB twin agrees bit-for-bit.  Empty inputs take the ≤ branches (0
    lines passes the line rules; 0 words fails the word-count rule).

    100 TB shape: pure JVM expressions over one projection — no shuffle, no
    python stage; the panel fuses into whatever scan feeds it.
    NULL text ≡ '' (fails the word-count rule, passes the ≤-rules — same as
    any empty doc; every flag stays non-null).
    """
    t = F.coalesce(F.col(text_col), F.lit(""))
    words = F.split(F.lower(F.trim(t)), r"\s+")
    n_words = token_count_expr(t)
    chars_in_words = F.length(F.regexp_replace(t, r"\s+", ""))
    n_sym = F.size(F.regexp_extract_all(t, F.lit(r"#|\.\.\.|…"), F.lit(0)))
    lines = F.filter(F.split(t, "\n"), lambda x: F.trim(x) != "")
    n_lines = F.size(lines)
    n_bullet = F.size(F.filter(lines, lambda x: F.trim(x).rlike(r"^[-*•]")))
    n_ellipsis = F.size(F.filter(lines, lambda x: F.trim(x).rlike(r"(\.\.\.|…)$")))
    n_alpha = F.size(F.filter(words, lambda x: x.rlike("[a-z]")))
    stop = F.array(*[F.lit(s) for s in ["the", "be", "to", "of", "and", "that", "have", "with"]])
    n_stop = F.size(F.array_intersect(F.array_distinct(words), stop))
    flags = {
        "r_wordcount": (n_words >= min_words) & (n_words <= max_words),
        "r_meanlen": (F.lit(3) * n_words <= chars_in_words)
        & (chars_in_words <= F.lit(10) * n_words),
        "r_symbol": n_sym * F.lit(10) <= n_words,
        "r_bullets": n_bullet * F.lit(10) <= n_lines * F.lit(9),
        "r_ellipsis": n_ellipsis * F.lit(10) <= n_lines * F.lit(3),
        "r_alpha": n_alpha * F.lit(10) >= n_words * F.lit(8),
        "r_stopwords": n_stop >= F.lit(2),
    }
    keep = None
    cols = [F.col(id_col), n_words.cast("long").alias("n_words")]
    for name, cond in flags.items():
        cols.append(cond.cast("int").alias(name))
        keep = cond if keep is None else (keep & cond)
    cols.append(keep.cast("int").alias("keep"))
    return df.select(*cols)


def kneser_ney_bigram_model(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_count: int = 1,
    scale: int = 1_000_000_000,
) -> DataFrame:
    """Interpolated Kneser–Ney bigram model (Chen & Goodman 1999) kept
    EXACT: with the standard discount d = 3/4,

        P_KN(b|a) = max(c(ab)−d, 0)/c(a·) + d·N1+(a·)/c(a·) · N1+(·b)/N

    multiplies out to the single rational

        [max(4·c(ab)−3, 0)·N + 3·N1+(a·)·N1+(·b)] / (4·c(a·)·N)

    over exact BIGINT counts (N = distinct bigram types, N1+(a·) =
    distinct continuations of a, N1+(·b) = distinct left contexts of b —
    the continuation count that makes KN model "how many contexts does b
    complete" instead of raw frequency).  Emitted as
    p_kn_i = num·scale div den — no float, no log, hash-gateable, and
    Σ_b P_KN(b|a) = 1 exactly per context once the λ(a)·P_cont(b) mass of
    UNSEEN continuations is included (model rows cover observed bigrams;
    the identity is pinned with exact fractions in pytest).

    ``min_count`` bounds the OUTPUT (model rows with c(ab) ≥ min_count);
    the statistics always come from the full corpus.

    Output: (bigram, cab, ca, n1_left, n1_right, p_kn_i).

    100 TB shape: the corpus collapses to its bigram vocabulary first (one
    bigram-keyed exchange, map-side combined); both continuation counts
    aggregate from that VOCAB table (vocab-sized shuffles keyed on a/b);
    N is a 1-row broadcast.  int64 bound: num ≤ 4·c(ab)·N needs
    c(ab)·N < 2^61 — a web-scale corpus reduces the fraction (gcd) or
    drops to 128-bit decimal; the contract here is exactness, the
    representation is swappable.
    """
    toks_expr = F.filter(
        F.split(F.lower(F.trim(F.col(text_col))), r"\s+"), lambda t: t != ""
    )
    from ..functions.udfs import bound

    bigram_arr = bound(
        toks_expr,
        lambda t: F.when(
            F.size(t) >= 2,
            F.zip_with(
                F.slice(t, 1, F.size(t) - 1),
                F.slice(t, 2, F.size(t) - 1),
                lambda a, b: F.concat(a, F.lit(" "), b),
            ),
        ).otherwise(F.array().cast("array<string>")),
    )
    counts = (
        docs.select(bigram_arr.alias("bg"))
        .select(F.explode("bg").alias("bigram"))
        .groupBy("bigram")
        .agg(F.count(F.lit(1)).alias("cab"))
        .withColumn("a", F.split(F.col("bigram"), " ").getItem(0))
        .withColumn("b", F.split(F.col("bigram"), " ").getItem(1))
    )
    left = counts.groupBy("a").agg(
        F.sum("cab").alias("ca"), F.count(F.lit(1)).alias("n1_left")
    )
    right = counts.groupBy("b").agg(F.count(F.lit(1)).alias("n1_right"))
    nbig = counts.agg(F.count(F.lit(1)).alias("nb"))
    return (
        counts.join(left, "a")
        .join(right, "b")
        .crossJoin(F.broadcast(nbig))
        .filter(F.col("cab") >= min_count)
        .select(
            "bigram",
            "cab",
            "ca",
            "n1_left",
            "n1_right",
            F.expr(
                f"(greatest(4 * cab - 3, 0) * nb + 3 * n1_left * n1_right)"
                f" * {scale} div (4 * ca * nb)"
            ).alias("p_kn_i"),
        )
    )


def unigram_viterbi_segment(
    words: DataFrame,
    vocab: dict,
    word_col: str = "word",
    max_pieces: int = 12,
) -> DataFrame:
    """SentencePiece-style unigram-LM Viterbi segmentation: split each
    word into the vocab pieces minimizing total integer cost, tie-broken
    by (fewer pieces, then lexicographically smallest piece sequence).
    The tie-break is enforced STRUCTURALLY: every DP state is one sortable
    string ``lpad(cost,4) | lpad(n_pieces,2) | piece-sequence`` and the
    transition is plain ``min()`` over candidate strings — an independent
    engine running the same string-min DP provably picks the same
    segmentation, so the OUTPUT segmentation (not just its cost) is
    hash-gateable.

    The DP is sequential per word (the honest python boundary, like the
    ROUGE LCS kernel); words are short, the vocab dict ships in the task
    closure, and the input is the DISTINCT word list — corpus-size
    independent.  Unsegmentable words (vocab lacks a cover) emit cost −1.

    Returns (word, cost, n_pieces, pieces)."""
    import pandas as pd

    from pyspark.sql.types import (
        LongType,
        StringType,
        StructField,
        StructType,
    )

    items = sorted(vocab.items())
    schema = StructType(
        [
            StructField("word", StringType()),
            StructField("cost", LongType()),
            StructField("n_pieces", LongType()),
            StructField("pieces", StringType()),
        ]
    )

    def segment(w: str):
        dp = [None] * (len(w) + 1)
        dp[0] = "0000|00|"
        for pos in range(1, len(w) + 1):
            best = None
            for piece, c in items:
                lp = len(piece)
                if lp <= pos and dp[pos - lp] is not None and w[pos - lp : pos] == piece:
                    pc, pn, pp = dp[pos - lp].split("|", 2)
                    path = piece if not pp else pp + " " + piece
                    cand = f"{int(pc) + c:04d}|{int(pn) + 1:02d}|{path}"
                    if best is None or cand < best:
                        best = cand
            dp[pos] = best
        return dp[len(w)]

    def gen(batches):
        for pdf in batches:
            rows = []
            for w in pdf[word_col]:
                w = str(w)
                enc = segment(w)
                if enc is None:
                    rows.append(
                        {"word": w, "cost": -1, "n_pieces": -1, "pieces": ""}
                    )
                else:
                    c, n, p = enc.split("|", 2)
                    rows.append(
                        {
                            "word": w,
                            "cost": int(c),
                            "n_pieces": int(n),
                            "pieces": p,
                        }
                    )
            yield pd.DataFrame(rows, columns=["word", "cost", "n_pieces", "pieces"])

    return words.select(F.col(word_col)).distinct().mapInPandas(gen, schema)


def lexical_diversity_panel(
    df: DataFrame,
    text_col: str = "text",
    group_col: str = "source",
    scale: int = 1_000_000,
) -> DataFrame:
    """Per-group lexical-diversity panel over whitespace tokens: type/token
    ratio, hapax ratio, and Yule's characteristic K — the repetitiveness
    statistic that, unlike TTR, is length-insensitive (Yule 1944; K =
    10^4 · (Σ_m m²·V(m) − N) / N² where V(m) = #types with frequency m,
    equivalently Σ_m m²·V(m) = Σ_types cnt²).  Low-diversity groups (bot
    spam, template farms) screen out of training mixes on K.

    All-BIGINT: ttr_i = types·scale div N, hapax_i = hapax·scale div N,
    yule_k_i = scale·(S2−N) div N² — at the default scale=1e6 that is K to
    2 decimals (K itself carries the 10^4); the factor overflows BIGINT at
    scale·S2 ≈ 9e18, so drop scale for multi-million-token groups (the
    knob THREADS through — it must not silently apply to TTR only).  Exact
    cross-multiplied integers.  Scale: two map-side-combinable aggregates —
    (group, token) counts then a group rollup; shuffle rows are token keys,
    never text."""
    toks = df.select(
        F.col(group_col).alias("grp"),
        F.explode(
            F.filter(
                F.split(F.lower(F.trim(F.col(text_col))), r"\s+"),
                lambda x: x != F.lit(""),
            )
        ).alias("tok"),
    )
    tc = toks.groupBy("grp", "tok").agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    agg = tc.groupBy("grp").agg(
        F.sum("cnt").cast("long").alias("n_tokens"),
        F.count(F.lit(1)).cast("long").alias("n_types"),
        F.sum(F.col("cnt") * F.col("cnt")).cast("long").alias("s2"),
        F.sum(F.when(F.col("cnt") == 1, 1).otherwise(0)).cast("long").alias("n_hapax"),
    )
    s = int(scale)
    return agg.select(
        "grp",
        "n_tokens",
        "n_types",
        "n_hapax",
        F.expr(f"CAST(({s} * n_types) div n_tokens AS BIGINT)").alias("ttr_i"),
        F.expr(f"CAST(({s} * n_hapax) div n_tokens AS BIGINT)").alias("hapax_i"),
        F.expr(
            f"CAST(({s} * (s2 - n_tokens)) div (n_tokens * n_tokens) AS BIGINT)"
        ).alias("yule_k_i"),
    )


def wordpiece_encode(
    words: DataFrame,
    vocab: list[str],
    word_col: str = "word",
) -> DataFrame:
    """WordPiece greedy longest-match-first encoding (Wu et al. 2016, the
    BERT tokenizer's inference rule — distinct from BPE's merge-order replay
    and from the unigram-LM Viterbi optimum): at each position take the
    LONGEST vocab piece matching the remaining suffix, where pieces starting
    ``##`` match only at non-initial positions; any position with no match
    makes the whole word ``[UNK]`` (the all-or-nothing BERT contract).

    Same execution shape as :func:`unigram_viterbi_segment`: the DISTINCT
    word list (corpus-size independent) through ONE mapInPandas stage with
    the vocab in the task closure; greedy is O(len·maxlen) per word via a
    set keyed by (form, is_continuation).

    Returns (word, n_pieces, pieces, is_unk) — is_unk the 0/1 BIGINT flag,
    UNK rows emit pieces='[UNK]', n_pieces=1."""
    import pandas as pd

    from pyspark.sql.types import LongType, StringType, StructField, StructType

    initial = {p for p in vocab if not p.startswith("##")}
    cont = {p[2:] for p in vocab if p.startswith("##")}
    max_len = max((len(p.lstrip("#")) for p in vocab), default=1)

    def encode(w: str):
        pieces, pos = [], 0
        while pos < len(w):
            table = initial if pos == 0 else cont
            hit = None
            for L in range(min(max_len, len(w) - pos), 0, -1):
                frag = w[pos : pos + L]
                if frag in table:
                    hit = frag
                    break
            if hit is None:
                return None
            pieces.append(hit if pos == 0 else "##" + hit)
            pos += len(hit)
        return pieces

    schema = StructType(
        [
            StructField("word", StringType()),
            StructField("n_pieces", LongType()),
            StructField("pieces", StringType()),
            StructField("is_unk", LongType()),
        ]
    )

    def gen(batches):
        for pdf in batches:
            rows = []
            for w in pdf[word_col]:
                w = str(w)
                ps = encode(w)
                if ps is None:
                    rows.append({"word": w, "n_pieces": 1, "pieces": "[UNK]", "is_unk": 1})
                else:
                    rows.append(
                        {"word": w, "n_pieces": len(ps), "pieces": " ".join(ps), "is_unk": 0}
                    )
            yield pd.DataFrame(rows, columns=["word", "n_pieces", "pieces", "is_unk"])

    return words.select(F.col(word_col)).distinct().mapInPandas(gen, schema)


def string_periodicity(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_chars: int = 200,
) -> DataFrame:
    """Smallest period of each document prefix (first ``max_chars`` chars):
    the KMP failure-function period p = n − π(n) — the machine-generated /
    template-spam signal repetition ratios miss when the repeated unit is
    long (a 40-char sentence stamped 5× has no repeated token bigram
    boundary issues but period 40).  ``is_periodic`` = the period divides n
    AND p ≤ n/2 (the string is an exact repetition of ≥ 2 units).

    Execution: O(n) failure function in ONE mapInPandas stage (the honest
    python boundary, same as ROUGE's LCS); the oracle replays the
    quadratic border definition relationally (min p with prefix(n−p) =
    suffix(n−p)) — cap ``max_chars`` keeps that O(n²) twin cheap at gate
    scale.  Returns (id, n, period, n_units, is_periodic)."""
    import pandas as pd

    from pyspark.sql.types import LongType, StringType, StructField, StructType

    schema = StructType(
        [
            StructField("id", StringType()),
            StructField("n", LongType()),
            StructField("period", LongType()),
            StructField("n_units", LongType()),
            StructField("is_periodic", LongType()),
        ]
    )

    def period_of(s: str) -> int:
        n = len(s)
        pi = [0] * n
        k = 0
        for i in range(1, n):
            while k > 0 and s[i] != s[k]:
                k = pi[k - 1]
            if s[i] == s[k]:
                k += 1
            pi[i] = k
        return n - pi[n - 1] if n else 0

    def gen(batches):
        for pdf in batches:
            rows = []
            for rid, txt in zip(pdf["id"], pdf["txt"]):
                s = str(txt)[:max_chars]
                n = len(s)
                p = period_of(s)
                periodic = 1 if n > 0 and p <= n // 2 and n % p == 0 else 0
                rows.append(
                    {
                        "id": str(rid),
                        "n": n,
                        "period": p,
                        "n_units": n // p if p else 0,
                        "is_periodic": periodic,
                    }
                )
            yield pd.DataFrame(
                rows, columns=["id", "n", "period", "n_units", "is_periodic"]
            )

    # NULL text coalesces to '' BEFORE the python boundary: str(None) inside
    # mapInPandas would be the 4-char string 'None' (or pandas 'nan') and get
    # a real period while a SQL twin propagates NULL — the linededup NULL-doc
    # divergence class.  '' keeps the row visible as (n=0, period=0).
    src = df.select(
        F.col(id_col).cast("string").alias("id"),
        F.coalesce(F.col(text_col), F.lit("")).alias("txt"),
    )
    return src.mapInPandas(gen, schema)


def vocabulary_drift_jsd(
    df_a: DataFrame,
    df_b: DataFrame,
    text_col: str = "text",
    scale: int = 1_000_000,
) -> DataFrame:
    """Cross-epoch vocabulary drift as Jensen–Shannon divergence between the
    two corpora's token distributions (base-e; bounded by ln 2) — the drift
    monitor a recurring-crawl training pipeline alarms on (distribution
    shift before model metrics move).

    Integer contract (dirichlet pattern, one ln per token-side):

        JSD = ½·Σ p·ln(2p/(p+q)) + ½·Σ q·ln(2q/(p+q))

    with p = ca/na, q = cb/nb exact count ratios, each ln taken on the
    cross-multiplied rational ``2·ca·nb / (ca·nb + cb·na)`` (one float ln,
    rounded to a scaled int, then an exact integer dot with the counts and
    a final div — both engines sum identical integers).  Absent tokens
    contribute 0 to their side's sum (0·ln… = 0) and drive the other
    side's term toward ln 2 — no smoothing, the exact JSD.

    Output: ONE row (n_tokens_a, n_tokens_b, n_shared_types, n_only_a,
    n_only_b, jsd_mi).  Scale: two vocab aggregates full-outer-joined on
    token; totals broadcast; the ln runs per vocab row."""
    def counts(df, side):
        # _tokens() is the module's ONE whitespace tokenizer (oracle
        # contract) — no inline copies
        return (
            df.select(
                F.explode(
                    F.filter(_tokens(F.col(text_col)), lambda x: x != F.lit(""))
                ).alias("tok")
            )
            .groupBy("tok")
            .agg(F.count(F.lit(1)).cast("long").alias(side))
        )
    ca, cb = counts(df_a, "ca"), counts(df_b, "cb")
    # localCheckpoint the vocab-sized joined frame: totals AND terms read
    # ONE materialization — unpinned, each consumer re-runs the tokenize/
    # aggregate/join chain (measured: 4 documents scans instead of 2)
    j = (
        ca.join(cb, "tok", "full")
        .select(
            "tok",
            F.coalesce("ca", F.lit(0)).cast("long").alias("ca"),
            F.coalesce("cb", F.lit(0)).cast("long").alias("cb"),
        )
        .localCheckpoint()
    )
    tot = j.agg(
        F.coalesce(F.sum("ca"), F.lit(0)).cast("long").alias("na"),
        F.coalesce(F.sum("cb"), F.lit(0)).cast("long").alias("nb"),
    )
    s = int(scale)
    terms = j.crossJoin(F.broadcast(tot)).select(
        "ca",
        "cb",
        "na",
        "nb",
        F.expr(
            f"CAST(CASE WHEN ca = 0 THEN 0 ELSE ca * CAST(round({s} * ln("
            f"(2.0 * ca * nb) / (CAST(ca AS DOUBLE) * nb + CAST(cb AS DOUBLE) * na)"
            f")) AS BIGINT) END AS BIGINT)"
        ).alias("ta"),
        F.expr(
            f"CAST(CASE WHEN cb = 0 THEN 0 ELSE cb * CAST(round({s} * ln("
            f"(2.0 * cb * na) / (CAST(ca AS DOUBLE) * nb + CAST(cb AS DOUBLE) * na)"
            f")) AS BIGINT) END AS BIGINT)"
        ).alias("tb"),
    )
    # GLOBAL aggregate with coalesces: an empty epoch yields one all-zero
    # row (never NULL BIGINTs, never zero rows — the benford/mcnemar
    # empty-input contract); jsd is 0 when either side is empty
    return terms.agg(
        F.coalesce(F.max("na"), F.lit(0)).cast("long").alias("n_tokens_a"),
        F.coalesce(F.max("nb"), F.lit(0)).cast("long").alias("n_tokens_b"),
        F.coalesce(
            F.sum(F.when((F.col("ca") > 0) & (F.col("cb") > 0), 1).otherwise(0)),
            F.lit(0),
        ).cast("long").alias("n_shared_types"),
        F.coalesce(
            F.sum(F.when((F.col("ca") > 0) & (F.col("cb") == 0), 1).otherwise(0)),
            F.lit(0),
        ).cast("long").alias("n_only_a"),
        F.coalesce(
            F.sum(F.when((F.col("ca") == 0) & (F.col("cb") > 0), 1).otherwise(0)),
            F.lit(0),
        ).cast("long").alias("n_only_b"),
        F.expr(
            "CAST(CASE WHEN coalesce(max(na), 0) = 0 OR coalesce(max(nb), 0) = 0 "
            "THEN 0 ELSE (sum(ta) div (2 * max(na))) + (sum(tb) div (2 * max(nb)))"
            " END AS BIGINT)"
        ).alias("jsd_mi"),
    )
