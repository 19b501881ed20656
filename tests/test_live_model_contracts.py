"""Conditional contract tests for the REAL model integrations (VERDICT r3 #4).

The sandbox has neither sentence-transformers nor spaCy, so the engine ships
deterministic stand-ins behind the reference's plug-in seams
(embedding.py::register_encoder auto-registration; kernels.py T5 detector).
These tests `importorskip` the real packages: they are SKIPPED here, but the
moment the packages appear they run the real SBert encoder / spaCy language
detector through the SAME plug-points the stubs use and pin the interface +
shape, so the stubs cannot drift from the real integration unnoticed.

Reference anchors: python/llm-service/libSbertLlmService.py:45-51 (SBert
all-mpnet-base-v2, 768-d encode), python/common-functions/aiwhisprBaseClasses.py:460-486
(spaCy en_core_web_sm + spacy-langdetect seed=42 sentence filter).
"""

import importlib

import numpy as np
import pytest


def test_sbert_contract_through_registry():
    pytest.importorskip("sentence_transformers")
    # fresh import so the optional-import auto-registration path actually runs
    import aiwhispr_spark.embedding as emb

    importlib.reload(emb)
    assert "sbert" in emb._ENCODERS, (
        "sentence_transformers importable but the sbert encoder did not "
        "auto-register (embedding.py optional-import block drifted)"
    )
    enc = emb.get_encoder("sbert")
    out = enc(["hello world", "a second document"])
    # the reference configures vector-dim 768 for all-mpnet-base-v2
    # (config/content-site/.../test_site.filepath.typesense.sbert.cfg:15)
    assert isinstance(out, np.ndarray)
    assert out.shape == (2, 768)
    assert out.dtype == np.float32
    # deterministic across calls (model in eval mode — the cosine gates
    # depend on reproducible encodes)
    again = enc(["hello world", "a second document"])
    assert np.allclose(out, again, atol=1e-6)


def test_sbert_batch_matches_reference_per_chunk_encode():
    pytest.importorskip("sentence_transformers")
    import aiwhispr_spark.embedding as emb

    importlib.reload(emb)
    enc = emb.get_encoder("sbert")
    # our batch path must equal the reference's one-encode-per-chunk loop
    # (libSbertLlmService.py:45-51) — vectorization must not change values
    texts = ["alpha beta", "gamma delta epsilon"]
    batched = enc(texts)
    model = emb._sbert_model()
    single = np.asarray([model.encode(t) for t in texts], dtype=np.float32)
    assert np.allclose(batched, single, atol=1e-5)


def test_spacy_langdetect_contract_on_t5_fixture():
    spacy = pytest.importorskip("spacy")
    pytest.importorskip("spacy_langdetect")
    try:
        nlp = spacy.load("en_core_web_sm")
    except OSError:
        pytest.skip("en_core_web_sm model not downloaded")
    from spacy.language import Language
    from spacy_langdetect import LanguageDetector

    if not Language.has_factory("language_detector"):
        Language.factory(
            "language_detector", func=lambda nlp, name: LanguageDetector(seed=42)
        )
    if "language_detector" not in nlp.pipe_names:
        nlp.add_pipe("language_detector", last=True)

    from aiwhispr_spark import kernels

    # reference flow (aiwhisprBaseClasses.py:465-486): keep sentences whose
    # detected language is 'en'; our validate_text_chunk must agree on the
    # canonical mixed fixture the stub's tests use
    chunk = (
        "The quick brown fox jumps over the lazy dog. "
        "Der schnelle braune Fuchs springt über den faulen Hund und die Katze. "
        "This sentence is clearly written in the English language."
    )
    doc = nlp(chunk)
    ref_keep = [
        s.text
        for s in doc.sents
        if s._.language.get("language") == "en"
    ]
    ours = kernels.validate_text_chunk(chunk)
    # contract: both keep the two English sentences and drop the German one
    assert any("quick brown fox" in s for s in ref_keep)
    assert all("braune Fuchs" not in s for s in ref_keep)
    assert "quick brown fox" in ours and "braune Fuchs" not in ours


def test_registered_encoder_reaches_spark_udf_path(spark):
    """Always-on half of the contract: a freshly-registered encoder (the
    same seam the sbert auto-registration uses) must flow through
    make_embed_udf into an actual Spark job with the right shape."""
    from aiwhispr_spark.embedding import register_encoder
    from aiwhispr_spark.functions.udfs import make_embed_udf

    def tiny(texts):
        return np.asarray([[float(len(t)), 1.0] for t in texts], dtype=np.float32)

    register_encoder("tiny2d", tiny)
    # ship the callable in the closure (registry mutations on the driver are
    # invisible to python workers — documented in make_embed_udf)
    udf = make_embed_udf(tiny)
    df = spark.createDataFrame([("ab",), ("abcd",)], "text string")
    rows = df.select(udf("text").alias("v")).collect()
    assert [list(map(float, r["v"])) for r in rows] == [[2.0, 1.0], [4.0, 1.0]]
