"""OpenIE-style pattern triple extraction (pure-Python kernel).

This stage is NEW (the reference mines no triples; SURVEY.md §7.1 E3) but it
operates on the reference-faithful sentence stream: sentences come from the
same segmenter the T5 language filter uses, over text extracted by the
byte-identical T1 kernel.

Pattern set (deterministic, regex-based SVO):

    <Subject> acquired <Object>
    <Subject> is based in <Object>
    <Subject> was founded by <Object>
    <Subject> is a <Object>
    <Subject> works for <Object>
    <Subject> is located in <Object>
    <Subject> owns <Object>
    <Subject> partnered with <Object>

Mentions are capitalized token runs (``Entity_7``, ``E7 Corp``, ``New York``).
Both the Spark engine (mapInPandas over chunk rows) and the single-process
oracle call this kernel, so P/R vs the oracle measures *distribution*
correctness, not kernel drift.
"""

from __future__ import annotations

import re

from .kernels import split_sentences

# A mention: a capitalized token, then capitalized or numeric continuation
# tokens ("Entity 7", "E7 Corp", "New York"; bare numbers can continue but not
# start a mention — "Entity 1" must capture whole or alias components glue).
_MENTION = r"((?:[A-Z][A-Za-z0-9_]*)(?: (?:[A-Z][A-Za-z0-9_]*|[0-9]+))*)"

_PATTERNS: list[tuple[re.Pattern, str]] = [
    (re.compile(_MENTION + r" acquired " + _MENTION), "acquired"),
    (re.compile(_MENTION + r" is based in " + _MENTION), "based_in"),
    (re.compile(_MENTION + r" was founded by " + _MENTION), "founded_by"),
    (re.compile(_MENTION + r" is a " + _MENTION), "is_a"),
    (re.compile(_MENTION + r" works for " + _MENTION), "works_for"),
    (re.compile(_MENTION + r" is located in " + _MENTION), "located_in"),
    (re.compile(_MENTION + r" owns " + _MENTION), "owns"),
    (re.compile(_MENTION + r" partnered with " + _MENTION), "partnered_with"),
]


def extract_triples(text: str) -> list[tuple[str, str, str]]:
    """All (subj, pred, obj) pattern matches over the sentence stream of ``text``.

    Output order: sentence order, then pattern order within a sentence —
    deterministic so the oracle and engine agree exactly.
    """
    out: list[tuple[str, str, str]] = []
    for sent in split_sentences(text):
        for pattern, pred in _PATTERNS:
            for m in pattern.finditer(sent):
                subj = m.group(1).strip()
                obj = m.group(2).strip().rstrip(".")
                if subj and obj:
                    out.append((subj, pred, obj))
    return out


# --- alias normalization for canonicalization (E6) ----------------------------------

_NORM_STRIP = re.compile(r"[^a-z0-9]+")
# corporate suffixes dropped for blocking keys (alias "E7 Corp" ~ "E7")
_CORP_SUFFIX = re.compile(r"\b(corp|corporation|inc|ltd|llc|gmbh|co|company)\b")


def normalize_alias(name: str) -> str:
    """Canonical token key for an entity mention: lowercase, drop corporate
    suffixes, strip non-alphanumerics.  ``Entity_7`` / ``Entity 7`` / ``E7
    Corp`` → ``entity7`` / ``entity7`` / ``e7`` (LSH blocking then merges the
    e7/entity7 family via shared shingles)."""
    s = name.lower()
    s = _CORP_SUFFIX.sub(" ", s)
    return _NORM_STRIP.sub("", s)


def alias_shingles(name: str, k: int = 3) -> list[str]:
    """Character k-shingles of the normalized alias (MinHash input)."""
    s = normalize_alias(name)
    if len(s) <= k:
        return [s] if s else []
    return sorted({s[i : i + k] for i in range(len(s) - k + 1)})
