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
    """Text with every email/IPv4/phone match replaced by its typed token."""
    out = F.regexp_replace(col, EMAIL_RE, EMAIL_TOKEN)
    out = F.regexp_replace(out, IPV4_RE, IP_TOKEN)
    return F.regexp_replace(out, PHONE_RE, PHONE_TOKEN)


def pii_counts_expr(col: Column) -> tuple[Column, Column, Column]:
    """(n_emails, n_ips, n_phones) match counts — the audit signal logged
    alongside redaction (counted on the SAME intermediate the redaction chain
    sees: ips count post-email-masking, phones post-ip-masking, so a string
    never double-counts across types)."""
    after_email = F.regexp_replace(col, EMAIL_RE, EMAIL_TOKEN)
    after_ip = F.regexp_replace(after_email, IPV4_RE, IP_TOKEN)
    n = lambda c, rx: F.size(F.regexp_extract_all(c, F.lit(rx), F.lit(0))).cast("long")  # noqa: E731
    return n(col, EMAIL_RE), n(after_email, IPV4_RE), n(after_ip, PHONE_RE)
