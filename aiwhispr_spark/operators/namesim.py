"""Jaro-Winkler name similarity for entity resolution.

Edit distance (operators' fuzzy Levenshtein path) punishes transpositions
and length asymmetry too hard for PERSON/ORG name matching; record-linkage
practice (Fellegi-Sunter deployments, census matching) scores name fields
with Jaro-Winkler — transposition-tolerant, prefix-boosted.  This is the
name-field comparator that operators/evaluation.py's Fellegi-Sunter scorer
and the canonicalization verify stage call for string-level agreement.

Semantics are pinned to DuckDB's ``jaro_winkler_similarity`` (the oracle —
two INDEPENDENT implementations must agree to 1e-12 on the gate corpus):
* operates on UTF-8 BYTES (multi-byte code points count per byte — matches
  DuckDB, and is also what makes the window arithmetic locale-free);
* match window = max(len)/2 - 1 (floor, min 0); transpositions = half the
  pairwise-mismatched matched bytes;
* either side empty → 0.0 (DuckDB returns 0 even for two empties);
* Winkler boost only when jaro > 0.7: + prefix_len(≤4) · 0.1 · (1 - jaro).

100 TB shape: a python comparator is the SLOW PATH by construction — it
runs Arrow-batched (pandas UDF) and ONLY on blocked candidate pairs, never
all-pairs: :func:`blocked_name_matches` joins on a byte-prefix block key
(the Winkler boost means any high-scoring pair overwhelmingly shares a
prefix), so the python stage sees O(candidates), and the exchange carries
(block_key, name) rows only.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import DoubleType


def jaro_bytes(a: bytes, b: bytes) -> float:
    """Plain Jaro over byte strings (DuckDB-compatible, unit-tested)."""
    la, lb = len(a), len(b)
    if la == 0 or lb == 0:
        return 0.0
    win = max(la, lb) // 2 - 1
    if win < 0:
        win = 0
    bm = [False] * lb
    am = [False] * la
    m = 0
    for i in range(la):
        lo, hi = max(0, i - win), min(lb, i + win + 1)
        for j in range(lo, hi):
            if not bm[j] and a[i] == b[j]:
                am[i] = bm[j] = True
                m += 1
                break
    if m == 0:
        return 0.0
    bs = [b[j] for j in range(lb) if bm[j]]
    t = 0
    k = 0
    for i in range(la):
        if am[i]:
            if a[i] != bs[k]:
                t += 1
            k += 1
    t //= 2
    return (m / la + m / lb + (m - t) / m) / 3.0


def jaro_winkler(a: str, b: str) -> float:
    """Jaro-Winkler on UTF-8 bytes, boost-thresholded at 0.7 like DuckDB."""
    ab, bb = a.encode("utf-8"), b.encode("utf-8")
    j = jaro_bytes(ab, bb)
    if j > 0.7:
        p = 0
        for x, y in zip(ab[:4], bb[:4]):
            if x != y:
                break
            p += 1
        j = j + p * 0.1 * (1.0 - j)
    return j


# DataType OBJECT, not a DDL string: module-level pandas_udf declarations
# re-execute when executors import the module, where no session exists to
# parse a DDL string (SESSION_OR_CONTEXT_NOT_EXISTS).
@pandas_udf(DoubleType())
def jaro_winkler_udf(a: pd.Series, b: pd.Series) -> pd.Series:
    av = a.fillna("")
    bv = b.fillna("")
    return pd.Series(
        [jaro_winkler(x, y) for x, y in zip(av, bv)], index=a.index, dtype="float64"
    )


def jw_i(a: Column, b: Column) -> Column:
    """Scaled-int Jaro-Winkler (round(jw * 1e4)) — the gate-friendly form."""
    return F.round(jaro_winkler_udf(a, b) * 10000).cast("long")


def blocked_name_matches(
    names_a: DataFrame,
    names_b: DataFrame,
    threshold: float = 0.85,
    prefix_len: int = 2,
) -> DataFrame:
    """(id_a, name_a, id_b, name_b, jw_i) for candidate pairs scoring
    ≥ threshold — prefix-blocked so the python comparator never sees
    all-pairs.  Inputs: (id, name).  Recall caveat (documented): pairs
    differing inside the first ``prefix_len`` bytes are never candidates;
    that is the standard prefix-blocking trade the Winkler boost itself
    justifies (such pairs forfeit the boost and rarely clear a high
    threshold)."""
    key = lambda c: F.substring(F.lower(c), 1, prefix_len)  # noqa: E731
    a = names_a.select(
        F.col("id").alias("id_a"), F.col("name").alias("name_a"),
        key(F.col("name")).alias("bk"),
    )
    b = names_b.select(
        F.col("id").alias("id_b"), F.col("name").alias("name_b"),
        key(F.col("name")).alias("bk"),
    )
    cand = a.join(b, "bk").drop("bk")
    scored = cand.withColumn("jw_i", jw_i(F.col("name_a"), F.col("name_b")))
    return scored.filter(F.col("jw_i") >= int(round(threshold * 10000)))


def soundex_expr(col: Column) -> Column:
    """American Soundex (NARA spec) as a PURE expression chain both
    engines can mirror — crucially H/W are TRANSPARENT (consonants
    separated only by H/W still collapse: Ashcraft → A261, not A226),
    which is where the simplified SQL-Server-style variant diverges.

    Pipeline: uppercase/strip → drop H/W → code letters (vowels→0) →
    collapse same-digit runs (per-digit '11+'→'1' replaces — RE2-safe, no
    backreferences, so the DuckDB twin is literally the same chain) →
    drop the leading code unless the first letter was H/W (it was already
    removed then) → drop 0s → first letter + 3 digits zero-padded."""
    u = F.regexp_replace(F.upper(col), "[^A-Z]", "")
    first = F.substring(u, 1, 1)
    x = F.regexp_replace(u, "[HW]", "")
    d = F.translate(
        x, "AEIOUYBFPVCGJKQSXZDTLMNR", "000000111122222222334556"
    )
    for dig in "0123456":
        d = F.regexp_replace(d, f"{dig}{dig}+", dig)
    tail = F.when(first.isin("H", "W"), d).otherwise(F.substring(d, 2, 1000))
    digits = F.regexp_replace(tail, "0", "")
    return F.when(u == "", F.lit("")).otherwise(
        F.concat(first, F.rpad(F.substring(digits, 1, 3), 3, "0"))
    )


def phonetic_blocks(
    names: DataFrame, name_col: str = "name"
) -> DataFrame:
    """Soundex blocking for entity resolution: (soundex, n_names, members)
    per block with ≥ 2 DISTINCT names — the classic phonetic candidate
    generator (pairs inside a block go to the expensive verifier; names in
    different blocks are never compared).  members is the sorted
    comma-join, deterministic.

    100 TB shape: one 4-char-key exchange over DISTINCT names; block
    membership ships (code, name) only."""
    coded = (
        names.select(F.col(name_col).alias("name"))
        .distinct()
        .select("name", soundex_expr(F.col("name")).alias("soundex"))
    )
    return (
        coded.groupBy("soundex")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_names"),
            F.array_join(F.sort_array(F.collect_list("name")), ",").alias(
                "members"
            ),
        )
        .filter(F.col("n_names") >= 2)
    )
