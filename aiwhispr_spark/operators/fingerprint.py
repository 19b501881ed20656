"""Winnowing document fingerprints (Schleimer/Wilkerson/Aiken, SIGMOD'03 —
the MOSS algorithm): robust LOCAL fingerprinting for partial-overlap
detection, the gap left between exact dedup (whole-doc hash) and MinHash
(whole-doc set similarity).  Winnowing guarantees any shared substring of
length >= w + k - 1 produces at least one shared fingerprint, so it catches
*copied passages* inside otherwise-different documents.

Scale design: fingerprint selection is a pure per-row JVM expression chain
(normalize -> k-gram hash array -> per-window min) — zero Python, zero
shuffle, runs at scan speed.  Every intermediate (normalized string, hash
array) is lambda-bound via functions.udfs.bound so higher-order lambdas
never re-evaluate it per element (the O(L^2) HOF trap).  The only shuffle
is the pair join, and it carries (doc_id, fp) pairs grouped by fingerprint
— the same skinny-band discipline as the MinHash LSH path
(operators/dedup.py).  At 100 TB a degenerate fingerprint (boilerplate
shared by millions of docs) would skew that join, so
shared_fingerprint_pairs drops fingerprints above ``max_df`` — the
stopword-fingerprint cut from the paper.

Reference parity: the reference has no passage-level dedup; this extends
its dedup story (SURVEY §2 dedup family) the way its MinHash/SimHash ops do.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.udfs import bound


def _norm(col: Column) -> Column:
    """MOSS normalization: lowercase, drop everything but [a-z0-9]."""
    return F.regexp_replace(F.lower(col), "[^a-z0-9]", "")


def winnow_picks_expr(text: Column, k: int = 8, w: int = 4) -> Column:
    """Array of selected fingerprints struct<fp:long, pos:int> for one
    document, or NULL when the normalized text has fewer than w k-grams.

    Standard winnowing: hash every k-gram of the normalized text (60-bit
    md5-prefix, the doc_fingerprint convention so DuckDB's
    ('0x'||substr(md5,1,15))::BIGINT agrees byte-for-byte), slide a window
    of w consecutive hashes, keep the minimum of each window; ties inside a
    window keep the RIGHTMOST occurrence (the paper's rule).  Positions are
    1-based k-gram indexes into the normalized text.
    """

    def picks_from_hs(hs: Column) -> Column:
        def window_pick(j: Column) -> Column:
            mh = F.array_min(F.slice(hs, j, w))

            def rightmost(p: Column) -> Column:
                return F.when(F.element_at(hs, p) == mh, p)

            # w elements x O(w) min re-eval = O(w^2) per window — constant
            pos = F.array_max(F.transform(F.sequence(j, j + F.lit(w - 1)), rightmost))
            return F.struct(mh.alias("fp"), pos.cast("int").alias("pos"))

        m = F.size(hs) - F.lit(w - 1)  # number of windows
        # guard m >= 1: Spark's sequence(1, m) would go DESCENDING for m < 1
        return F.when(
            m >= 1, F.array_distinct(F.transform(F.sequence(F.lit(1), m), window_pick))
        )

    def hs_from_s(s: Column) -> Column:
        n = F.length(s) - F.lit(k - 1)  # number of k-grams

        def hash_at(i: Column) -> Column:
            return F.conv(F.substring(F.md5(s.substr(i, F.lit(k))), 1, 15), 16, 10).cast(
                "long"
            )

        hs = F.when(n >= 1, F.transform(F.sequence(F.lit(1), n), hash_at))
        return bound(hs, picks_from_hs)

    return bound(_norm(text), hs_from_s)


def winnow_fingerprints(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 8,
    w: int = 4,
) -> DataFrame:
    """One row per selected fingerprint: (id, fp, pos), distinct per doc."""
    picked = df.select(
        F.col(id_col), winnow_picks_expr(F.col(text_col), k=k, w=w).alias("picks")
    ).where(F.col("picks").isNotNull())
    out = picked.select(id_col, F.explode("picks").alias("sel"))
    return out.select(id_col, F.col("sel.fp").alias("fp"), F.col("sel.pos").alias("pos"))


def fingerprint_summary(fps: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Per-document gateable digest: fingerprint count + md5 of the sorted
    fp:pos set (zero-padded so string sort == numeric sort)."""
    key = F.concat(
        F.lpad(F.col("fp").cast("string"), 19, "0"),
        F.lit(":"),
        F.lpad(F.col("pos").cast("string"), 6, "0"),
    )
    return fps.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_fp"),
        F.md5(F.array_join(F.sort_array(F.collect_list(key)), ",")).alias("fp_md5"),
    )


def shared_fingerprint_pairs(
    fps: DataFrame,
    id_col: str = "doc_id",
    min_shared: int = 3,
    max_df: int | None = None,
) -> DataFrame:
    """Document pairs (id_a < id_b) sharing >= min_shared distinct
    fingerprint VALUES (positions ignored — a moved passage still matches).

    ``max_df`` drops fingerprints present in more than that many documents
    before the self-join (boilerplate cut) — REQUIRED at scale, optional at
    gate scale so the oracle stays closed-form.
    """
    d = fps.select(F.col(id_col).alias("id"), "fp").distinct()
    if max_df is not None:
        rare = (
            d.groupBy("fp")
            .agg(F.count(F.lit(1)).alias("df"))
            .filter(F.col("df") <= max_df)
            .select("fp")
        )
        d = d.join(rare, "fp")
    a = d.select(F.col("id").alias("id_a"), "fp")
    b = d.select(F.col("id").alias("id_b"), "fp")
    return (
        a.join(b, "fp")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).cast("long").alias("shared"))
        .filter(F.col("shared") >= min_shared)
    )


def cdc_chunks(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    window: int = 16,
    mask: int = 32,
) -> DataFrame:
    """Content-defined chunking (Rabin/LBFS-style, gear rolling hash):
    cut after position p (1-based) whenever

        h(p) = Σ_{j=0..window−1} gear(c_{p−j}) · 2^j  (mod 2^32)

    satisfies h(p) % mask == 0, with gear(c) = c·2654435761 mod 2^32
    (Knuth multiplicative — a pure FORMULA, not a lookup table, so an
    independent engine can recompute it).  h is defined only for
    p ≥ window; the final chunk always ends at the text end.  The cut
    decision depends on the local window alone — the shift-resistance
    property that makes CDC dedup robust to insertions (an edit moves
    at most the two adjacent cuts, unlike fixed-size blocks where one
    byte shifts EVERY later boundary).

    Deliberately no min-chunk skip: FastCDC's min-size rule makes each
    cut depend on the previous cut (sequential), which would kill the
    closed form both engines verify; pure windowed cuts keep boundary
    placement embarrassingly parallel per position.

    Returns one row per chunk: (id, chunk_idx 0-based, start 1-based,
    chunk_len, chunk_md5).  ASCII-text contract (codepoint = byte).

    100 TB shape: the whole boundary computation is a per-doc JVM array
    fold (O(window·len), zero shuffle, no python); downstream dedup
    groups by chunk_md5 — the shuffle carries (md5, id, idx), never
    chunk bytes."""
    c = F.col(text_col)
    n = F.length(c)

    def gear(ch):
        return (F.ascii(ch).cast("long") * F.lit(2654435761)) % F.lit(4294967296)

    def h_at(p):
        # Σ j = 0..window−1: gear(text[p−j]) · 2^j — p is a Column, j a
        # python int, so the weight 2^j is a LITERAL and the whole window
        # unrolls into one fixed JVM expression (no shift-by-column,
        # which Spark's shiftleft cannot do)
        h = F.lit(0).cast("long")
        for j in range(window):
            h = h + gear(c.substr(p - j, F.lit(1))) * F.lit(1 << j)
        return h % F.lit(4294967296)

    # cut positions: every p in [window, n] with h(p) % mask == 0, plus n
    cuts = F.array_distinct(
        F.concat(
            F.when(
                n >= window,
                F.filter(
                    F.sequence(F.lit(window), F.greatest(n, F.lit(window))),
                    lambda p: (p <= n) & (h_at(p) % mask == 0),
                ),
            ).otherwise(F.array().cast("array<int>")),
            F.array(n.cast("int")),
        )
    )
    starts = F.concat(F.array(F.lit(1)), F.transform(F.slice(cuts, 1, F.size(cuts) - 1), lambda e: e + 1))
    chunks = F.zip_with(
        starts,
        cuts,
        lambda s, e: F.struct(
            s.alias("start"), (e - s + 1).alias("chunk_len")
        ),
    )
    out = docs.select(
        F.col(id_col),
        c.alias("_t"),
        F.posexplode(chunks).alias("chunk_idx", "ch"),
    )
    return out.select(
        id_col,
        F.col("chunk_idx").cast("long").alias("chunk_idx"),
        F.col("ch.start").cast("long").alias("start"),
        F.col("ch.chunk_len").cast("long").alias("chunk_len"),
        F.md5(F.expr("substring(_t, ch.start, ch.chunk_len)")).alias("chunk_md5"),
    ).filter(F.col("chunk_len") > 0)


def cdc_dup_chunks(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    window: int = 16,
    mask: int = 32,
    min_occ: int = 2,
) -> DataFrame:
    """Cross-corpus duplicate CDC chunks: chunks whose bytes recur
    (storage-dedup view of corpus redundancy).  Groups by chunk_md5 —
    the exchange carries 16-byte digests, not chunk text."""
    ch = cdc_chunks(docs, id_col, text_col, window, mask)
    return (
        ch.groupBy("chunk_md5")
        .agg(
            F.count("*").cast("long").alias("n_occ"),
            F.min("chunk_len").cast("long").alias("chunk_len"),
            F.min(id_col).cast("long").alias("first_id"),
        )
        .filter(F.col("n_occ") >= min_occ)
    )
