"""PII redaction for web-corpus curation: mask emails, IPv4 addresses, and
international-format phone numbers with typed placeholder tokens (the C4 /
Dolma pre-training hygiene pass).

The reference indexes document text verbatim (no scrubbing anywhere in
`python/text-processors/`); a corpus destined for model training needs PII
masked BEFORE anything else persists the text, so this sits with the other
first-class curation ops.

Patterns use only the regex subset with identical semantics in Java
(Spark executors) and RE2 (DuckDB oracle): character classes, bounded
quantifiers, non-capturing groups, ``\\b`` — no lookaround, no backrefs.
Redaction order is part of the contract (email → ip → phone, each pass over
the previous pass's output) and is mirrored token-for-token by the oracle.

100 TB shape: one narrow JVM projection — three ``regexp_replace`` passes
fused into the same whole-stage-codegen span as the rest of the cleaning
chain.  Zero shuffle, zero python.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

EMAIL_RE = r"[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}"
IPV4_RE = r"\b(?:\d{1,3}\.){3}\d{1,3}\b"
PHONE_RE = r"\+\d{1,3}[-. ]\d{3}[-. ]\d{3,4}(?:[-. ]\d{3,4})?"

EMAIL_TOKEN = "<EMAIL>"
IP_TOKEN = "<IP>"
PHONE_TOKEN = "<PHONE>"


def redact_pii_expr(col: Column) -> Column:
    """Text with every email/IPv4/phone match replaced by its typed token.
    NULL text ≡ '' (redacts to '', never NULL — a NULL passing through
    three regexp_replace stages would null every downstream md5/count)."""
    col = F.coalesce(col, F.lit(""))
    out = F.regexp_replace(col, EMAIL_RE, EMAIL_TOKEN)
    out = F.regexp_replace(out, IPV4_RE, IP_TOKEN)
    return F.regexp_replace(out, PHONE_RE, PHONE_TOKEN)


def pii_counts_expr(col: Column) -> tuple[Column, Column, Column]:
    """(n_emails, n_ips, n_phones) match counts — the audit signal logged
    alongside redaction (counted on the SAME intermediate the redaction chain
    sees: ips count post-email-masking, phones post-ip-masking, so a string
    never double-counts across types).  NULL text ≡ '' → zero counts."""
    col = F.coalesce(col, F.lit(""))
    after_email = F.regexp_replace(col, EMAIL_RE, EMAIL_TOKEN)
    after_ip = F.regexp_replace(after_email, IPV4_RE, IP_TOKEN)
    n = lambda c, rx: F.size(F.regexp_extract_all(c, F.lit(rx), F.lit(0))).cast("long")  # noqa: E731
    return n(col, EMAIL_RE), n(after_email, IPV4_RE), n(after_ip, PHONE_RE)


def k_anonymity_audit(
    df,
    qi_cols,
    ladder_col,
    k: int = 5,
):
    """k-anonymity audit with a two-level LOCAL generalization ladder
    (Sweeney 2002; Samarati's generalization lattice, restricted to one
    rung + suppression).  ``qi_cols`` are the stable quasi-identifiers,
    ``ladder_col`` the most specific one (the first to generalize away):

    * level 0 — equivalence classes over (qi_cols…, ladder_col) of size
      ≥ k are already k-anonymous and publish as-is;
    * level 1 — ROWS from under-k level-0 classes regroup over qi_cols
      only (ladder value generalized to the −1 sentinel); classes now
      ≥ k publish at level 1;
    * level 2 — anything still under k is SUPPRESSED (reported with
      n_rows, the release would drop them).

    Returns one row per FINAL class: (*qi_cols, <ladder_col> with −1 for
    generalized, anon_level, n_rows).  Integer sentinel, never NULL —
    the cross-engine NULL-BIGINT stringification trap.

    100 TB shape: two QI-keyed aggregates, the second over ONLY the
    residue of the first (under-k classes are by definition < k rows
    each, so the level-1 input is the long tail, not the corpus); both
    map-side combine.  No windows, no collect."""
    from pyspark.sql import functions as F

    qi = list(qi_cols)
    lvl0 = df.groupBy(*qi, ladder_col).agg(F.count("*").cast("long").alias("n_rows"))
    ok0 = lvl0.filter(F.col("n_rows") >= k).select(
        *qi,
        F.col(ladder_col).cast("long").alias(ladder_col),
        F.lit(0).cast("long").alias("anon_level"),
        "n_rows",
    )
    residue = lvl0.filter(F.col("n_rows") < k)
    lvl1 = residue.groupBy(*qi).agg(F.sum("n_rows").cast("long").alias("n_rows"))
    ok1 = lvl1.filter(F.col("n_rows") >= k).select(
        *qi,
        F.lit(-1).cast("long").alias(ladder_col),
        F.lit(1).cast("long").alias("anon_level"),
        "n_rows",
    )
    supp = lvl1.filter(F.col("n_rows") < k).select(
        *qi,
        F.lit(-1).cast("long").alias(ladder_col),
        F.lit(2).cast("long").alias("anon_level"),
        "n_rows",
    )
    return ok0.unionByName(ok1).unionByName(supp)


def l_diversity_audit(
    df,
    qi_cols,
    sensitive_col,
    l: int = 3,  # noqa: E741
    scale: int = 1_000_000,
):
    """l-diversity audit (Machanavajjhala et al. 2006): k-anonymity alone
    leaks when an equivalence class is uniform in the SENSITIVE attribute
    (the homogeneity attack), so audit each QI class for (a) DISTINCT
    l-diversity — ≥ l distinct sensitive values — and (b) ENTROPY
    l-diversity — entropy(class) ≥ ln(l).

    Integer contract: entropy = Σ (cnt/n)·ln(n/cnt) is computed as
    ``Σ cnt·round(scale·ln(n/cnt)) div n`` — ONE float ln per (class,
    value) rounded to a scaled int BEFORE the integer dot product (the
    dirichlet_ql_rank pattern), so both engines sum identical integers;
    the entropy verdict compares against ``round(scale·ln(l))`` computed
    driver-side.  Output per class: (*qi_cols, n_rows, n_distinct,
    distinct_l_ok, entropy_mi, entropy_l_ok).

    100 TB shape: two map-side-combinable aggregates — (QI…, sensitive)
    counts, then a QI rollup; no windows, no text in the shuffle."""
    import math

    from pyspark.sql import functions as F

    qi = list(qi_cols)
    thr_i = int(round(scale * math.log(l)))
    vc = df.groupBy(*qi, sensitive_col).agg(F.count("*").cast("long").alias("cnt"))
    term = F.expr(f"CAST(round({int(scale)} * ln(CAST(n AS DOUBLE) / cnt)) AS BIGINT)")
    # two-pass: class totals first, then the per-value ln against the total
    totals = vc.groupBy(*qi).agg(
        F.sum("cnt").cast("long").alias("n"),
        F.count(F.lit(1)).cast("long").alias("n_distinct"),
    )
    joined = vc.join(totals, qi).withColumn("term_i", term * F.col("cnt"))
    out = joined.groupBy(*qi, "n", "n_distinct").agg(
        F.expr("CAST(sum(term_i) div max(n) AS BIGINT)").alias("entropy_mi")
    )
    return out.select(
        *qi,
        F.col("n").alias("n_rows"),
        "n_distinct",
        F.when(F.col("n_distinct") >= l, F.lit(1)).otherwise(F.lit(0)).cast("long").alias(
            "distinct_l_ok"
        ),
        "entropy_mi",
        F.when(F.col("entropy_mi") >= thr_i, F.lit(1)).otherwise(F.lit(0)).cast("long").alias(
            "entropy_l_ok"
        ),
    )
