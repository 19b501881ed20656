"""Byte-identity tests: our kernels vs the ACTUAL reference code.

T1-T3 import the reference modules directly (they depend only on `re`).
C1 imports the real ``srcDocProcessor.createChunks`` with spaCy stubbed out
and the language validator forced to identity, so the chunk bytes exercise
the reference's genuine control flow — including its stale-word-list quirk
on lines longer than 2× chunksize.
"""

from __future__ import annotations

import importlib
import sys
import types

import pytest

from aiwhispr_spark import kernels
from aiwhispr_spark.sources.synthetic import make_doc_html

REF = "/root/reference/python"


def _load_ref(name: str, path: str):
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


ref_clean = _load_ref("ref_clean", f"{REF}/common-functions/extract_cleantext_from_html.py")
ref_extract = _load_ref("ref_extract", f"{REF}/common-functions/extract_codeblocks_from_html.py")
ref_replace = _load_ref("ref_replace", f"{REF}/common-functions/replace_codeblocks_from_html.py")

CORPUS = [make_doc_html(i)[0] for i in range(60)]
EXTRA = [
    "",
    "plain text no tags",
    "&lt;code&gt no semicolon &lt;code&gt; with semicolon",
    "<p>a &amp; b &#65; &#x41; &unknown; &#xA; mix</p>",
    "<code>one</code> mid <code>two\nlines</code> end",
    "nested <code><b>bold</b></code> tags",
    "UPPER &AMP; is not matched (lowercase-only entity class)",
    "&#1234567; seven digits exceeds {1,6}",
]


@pytest.mark.parametrize("i", range(len(CORPUS) + len(EXTRA)))
def test_t1_cleantext_byte_identity(i):
    s = (CORPUS + EXTRA)[i]
    assert kernels.clean_html(s) == ref_clean.get(s)


@pytest.mark.parametrize("i", range(len(CORPUS) + len(EXTRA)))
def test_t2_codeblocks_byte_identity(i):
    s = (CORPUS + EXTRA)[i]
    assert kernels.extract_codeblocks(s) == ref_extract.get(s)


@pytest.mark.parametrize("i", range(len(CORPUS) + len(EXTRA)))
def test_t3_replace_byte_identity(i):
    s = (CORPUS + EXTRA)[i]
    n = len(ref_extract.get(s))
    assert kernels.replace_codeblocks(s, n) == ref_replace.replace(s, n)


# --- C1: run the real reference chunker with spaCy stubbed --------------------------


@pytest.fixture(scope="module")
def ref_doc_processor_cls():
    # stub the three unavailable imports; everything else in the module is stdlib
    spacy_stub = types.ModuleType("spacy")
    spacy_stub.prefer_gpu = lambda: False
    spacy_stub.load = lambda name: types.SimpleNamespace(add_pipe=lambda *a, **k: None)
    lang_mod = types.ModuleType("spacy.language")

    class _Lang:
        @staticmethod
        def factory(name, func=None):
            return None

    lang_mod.Language = _Lang
    sld = types.ModuleType("spacy_language_detection")
    sld.LanguageDetector = lambda seed=0: None
    saved = {k: sys.modules.get(k) for k in ("spacy", "spacy.language", "spacy_language_detection")}
    sys.modules["spacy"] = spacy_stub
    sys.modules["spacy.language"] = lang_mod
    sys.modules["spacy_language_detection"] = sld
    sys.path.insert(0, f"{REF}/common-functions")
    sys.path.insert(0, f"{REF}/common-objects")
    try:
        mod = _load_ref("ref_base", f"{REF}/base-classes/aiwhisprBaseClasses.py")
        yield mod.srcDocProcessor
    finally:
        for k, v in saved.items():
            if v is None:
                sys.modules.pop(k, None)
            else:
                sys.modules[k] = v


def _ref_chunks(cls, tmp_path, text: str, chunksize: int) -> list[str]:
    src = tmp_path / "doc.txt"
    src.write_text("placeholder")
    proc = cls(str(src))
    # force the language validator to identity so the test isolates C1 bytes
    proc.validateTextChunk = lambda chunk: chunk
    with open(proc.extracted_text_file_path, "w") as f:
        f.write(text)
    chunk_dict = proc.createChunks(chunksize)
    by_no = sorted(((no, path) for path, no in chunk_dict.items()))
    out = []
    for _, path in by_no:
        # saveTextChunk writes with the locale default (utf-8); read it back the same
        with open(path, newline="\n") as f:
            out.append(f.read())
    return out


CHUNK_CASES = [
    ("", 10),
    ("one two three", 10),  # single partial chunk
    (" ".join(f"w{i}" for i in range(10)), 10),  # exact fill, one line
    (" ".join(f"w{i}" for i in range(11)), 10),  # one-word spill
    ("\n".join(f"line{i} a b c" for i in range(12)), 10),  # multi-line fills
    (" ".join(f"w{i}" for i in range(25)), 10),  # single line > 2x chunk (stale-list quirk)
    (" ".join(f"w{i}" for i in range(75)), 10),  # > 7x chunk
    ("\n".join(" ".join(f"x{i}_{j}" for j in range(7)) for i in range(40)), 10),
    ("a\n\n\nb c\n  \nd", 3),  # blank lines
    ("tab\tsep words\t here\nand more", 4),
]


@pytest.mark.parametrize("case_i", range(len(CHUNK_CASES)))
def test_c1_chunker_byte_identity(ref_doc_processor_cls, tmp_path, case_i):
    text, chunksize = CHUNK_CASES[case_i]
    ours = kernels.bucket_fill_chunks(text, chunksize, validate=False)
    ref = _ref_chunks(ref_doc_processor_cls, tmp_path, text, chunksize)
    assert ours == ref


@pytest.mark.parametrize("i", range(0, 40))
def test_c1_chunker_corpus_byte_identity(ref_doc_processor_cls, tmp_path, i):
    """Full extracted corpus docs through both chunkers at the reference's
    default 700-word size, including the utf-8→ISO-8859-1 disk hop."""
    html = make_doc_html(i)[0]
    text = kernels.clean_html(html)
    ours = kernels.bucket_fill_chunks(kernels.file_roundtrip(text), 700, validate=False)
    ref = _ref_chunks(ref_doc_processor_cls, tmp_path, text, 700)
    assert ours == ref


def test_t7_strip_punctuation():
    assert kernels.strip_punctuation("a;b, c'd (e) ~f") == "ab cd e  f"
    assert kernels.strip_punctuation("") == ""


def test_t8_truncate():
    assert kernels.truncate_display("x" * 501) == "x" * 497 + "..."
    assert kernels.truncate_display("x" * 500) == "x" * 500


def test_t9_display_url():
    # http prefix → quote_plus(prefix, safe='/:') + '/' + quote(path)
    # (searchService.py:153-156); space in prefix → '+', in path → '%20'
    assert (
        kernels.display_url("http://a b.com:8080/x", "p q/r?.txt")
        == "http://a+b.com:8080/x/p%20q/r%3F.txt"
    )
    # https also matches the reference's `[0:4] == 'http'` check
    assert kernels.display_url("https://a", "b").startswith("https://a/")
    # non-http → plain concatenation, no quoting
    assert kernels.display_url("/mnt/data x", "p q.txt") == "/mnt/data x/p q.txt"


def test_t5_language_filter_drops_german():
    text = "The data is large. Der schnelle Fuchs springt über den faulen Hund und die Daten sind groß. It works well."
    out = kernels.validate_text_chunk(text)
    assert "Fuchs" not in out
    assert "The data is large." in out and "It works well." in out


def test_t6_roundtrip_restores_utf8():
    mojibake = "café".encode("utf-8").decode("iso-8859-1")
    assert kernels.fix_encoding(mojibake) == "café"
