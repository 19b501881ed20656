"""Deterministic, library-free text embedder + pluggable model registry.

The reference embeds each chunk with SBert ``all-mpnet-base-v2`` via one
``model.encode(text)`` call per chunk (python/llm-service/libSbertLlmService.py:45-51,
call site python/content-site/filepathContentSite.py:135) — the GIL-bound hot
loop.  Our engine batch-encodes inside Arrow pandas UDFs; since neither
sentence-transformers nor network model downloads exist in this sandbox, the
default model is a deterministic feature-hash embedder (seeded, pure
numpy) with the same interface, so cosine top-k results are exactly
reproducible (SURVEY.md §7.4).  Real SBert/OpenAI encoders plug in through
``register_encoder`` mirroring the reference's llm-service plug-in design
(python/common-functions/initializeLlmService.py:16-19).
"""

from __future__ import annotations

import hashlib
import re

import numpy as np

DEFAULT_DIM = 64

_TOKEN = re.compile(r"[a-z0-9]+")


def _token_slot(token: str, dim: int) -> tuple[int, float]:
    """Stable (slot, sign) for a token from its md5 — platform-independent
    (no Python hash randomization)."""
    h = hashlib.md5(token.encode("utf-8")).digest()
    slot = int.from_bytes(h[:4], "little") % dim
    sign = 1.0 if h[4] & 1 else -1.0
    return slot, sign


def hash_embed_texts(texts: list[str], dim: int = DEFAULT_DIM) -> np.ndarray:
    """Batch feature-hash embedding: token → signed slot, L2-normalized float32.

    Vectorized per batch; the per-token md5 work is cached across a batch so
    repeated vocabulary costs once (the pandas-UDF analogue of the reference's
    per-executor model singleton, initializeDocumentProcessor.py:27-45).
    """
    out = np.zeros((len(texts), dim), dtype=np.float32)
    cache: dict[str, tuple[int, float]] = {}
    for row, text in enumerate(texts):
        if not text:
            continue
        for tok in _TOKEN.findall(text.lower()):
            slot_sign = cache.get(tok)
            if slot_sign is None:
                slot_sign = _token_slot(tok, dim)
                cache[tok] = slot_sign
            out[row, slot_sign[0]] += slot_sign[1]
    norms = np.linalg.norm(out, axis=1, keepdims=True)
    np.divide(out, norms, out=out, where=norms > 0)
    return out


def hash_embed(text: str, dim: int = DEFAULT_DIM) -> list[float]:
    """Single-text convenience wrapper (oracle path)."""
    return hash_embed_texts([text], dim)[0].tolist()


def cosine(a, b) -> float:
    """Exact cosine similarity (float64) between two vectors."""
    av = np.asarray(a, dtype=np.float64)
    bv = np.asarray(b, dtype=np.float64)
    na = np.linalg.norm(av)
    nb = np.linalg.norm(bv)
    if na == 0.0 or nb == 0.0:
        return 0.0
    return float(av @ bv / (na * nb))


# --- encoder registry (mirrors reference U4 dynamic dispatch, kept plain) ----------

_ENCODERS = {"hash64": lambda texts: hash_embed_texts(texts, 64)}


def register_encoder(name: str, fn) -> None:
    _ENCODERS[name] = fn


def get_encoder(name: str = "hash64"):
    return _ENCODERS[name]


try:  # pragma: no cover - optional heavy dependency, absent in sandbox
    from sentence_transformers import SentenceTransformer  # noqa: F401

    def _sbert(texts: list[str]) -> np.ndarray:
        model = _sbert_model()
        return np.asarray(model.encode(list(texts), batch_size=64), dtype=np.float32)

    _SBERT_SINGLETON = {}

    def _sbert_model():
        if "m" not in _SBERT_SINGLETON:
            _SBERT_SINGLETON["m"] = SentenceTransformer("all-mpnet-base-v2")
        return _SBERT_SINGLETON["m"]

    register_encoder("sbert", _sbert)
except ImportError:
    pass
