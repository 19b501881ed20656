"""Property-based byte-identity: hypothesis-generated adversarial HTML-ish
strings through our kernels vs the ACTUAL reference functions (same loading
approach as test_kernels.py).  The fixture corpus covers the designed cases;
this hunts the undesigned ones — half-open tags, entity fragments, nested and
unterminated <code> spans, stray semicolons, unicode."""

from __future__ import annotations

import importlib.util

from hypothesis import given, settings, strategies as st

from aiwhispr_spark import kernels
from tests.test_kernels import _ref_chunks, ref_doc_processor_cls  # noqa: F401 (fixture)

REF = "/root/reference/python"


def _load_ref(name: str, path: str):
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


ref_clean = _load_ref("ref_clean_prop", f"{REF}/common-functions/extract_cleantext_from_html.py")
ref_extract = _load_ref("ref_extract_prop", f"{REF}/common-functions/extract_codeblocks_from_html.py")
ref_replace = _load_ref("ref_replace_prop", f"{REF}/common-functions/replace_codeblocks_from_html.py")

# fragments biased toward the regex's edge cases, freely interleaved
_FRAGMENTS = st.sampled_from(
    [
        "<code>", "</code>", "<pre>", "</pre>", "<", ">", "<p>", "</p>",
        "&lt;code&gt", "&lt;code&gt;", "&lt;/code&gt;", "&lt;pre&gt;", "&lt;/pre&gt;",
        "p&gt;", "/p&gt;", "&#xA;", "&amp;", "&amp", "&#65;", "&#x41;", "&#1234567;",
        "&unknown;", "&UPPER;", "&;", ";", "&", "#", "x", "\n", " ", "word",
        "é", "ü", "£", "0", "a1b2",
    ]
)
_HTMLISH = st.lists(_FRAGMENTS, min_size=0, max_size=30).map("".join)
_ANYTEXT = st.text(max_size=200)


@settings(max_examples=300, deadline=None)
@given(st.one_of(_HTMLISH, _ANYTEXT))
def test_t1_clean_property(s):
    assert kernels.clean_html(s) == ref_clean.get(s)


@settings(max_examples=300, deadline=None)
@given(st.one_of(_HTMLISH, _ANYTEXT))
def test_t2_extract_property(s):
    assert kernels.extract_codeblocks(s) == ref_extract.get(s)


@settings(max_examples=300, deadline=None)
@given(st.one_of(_HTMLISH, _ANYTEXT), st.integers(min_value=0, max_value=4))
def test_t3_replace_property(s, n):
    assert kernels.replace_codeblocks(s, n) == ref_replace.replace(s, n)


def test_c1_chunker_property(ref_doc_processor_cls, tmp_path):
    """C1 vs the real reference chunker on generated word/line streams around
    the boundary cases (exact fill, spill, long single lines that trip the
    stale-word-list quirk, blank lines, tab separators).  Uses hypothesis as
    a generator loop (the function-scoped tmp_path forbids @given)."""
    import random as _random

    from aiwhispr_spark.kernels import bucket_fill_chunks

    rng = _random.Random(1234)
    words = ["a", "bb", "ccc", "w0", "x_y", "zz9"]
    for trial in range(60):
        chunksize = rng.choice([1, 2, 3, 7, 10])
        n_lines = rng.randint(0, 8)
        lines = []
        for _ in range(n_lines):
            n_words = rng.choice([0, 1, chunksize - 1, chunksize, chunksize + 1,
                                  2 * chunksize + 3, rng.randint(0, 3 * chunksize)])
            sep = rng.choice([" ", "  ", "\t"])
            lines.append(sep.join(rng.choice(words) for _ in range(max(n_words, 0))))
        text = "\n".join(lines)
        ours = bucket_fill_chunks(text, chunksize, validate=False)
        case_dir = tmp_path / f"t{trial}"
        case_dir.mkdir()
        ref = _ref_chunks(ref_doc_processor_cls, case_dir, text, chunksize)
        assert ours == ref, (trial, chunksize, repr(text)[:200])


@settings(max_examples=200, deadline=None)
@given(st.text(alphabet="ab ;,'-:\"#!@%&*()[]{}?+`|^~\n", max_size=120))
def test_t7_strip_property(s):
    """T7 vs the reference's word loop (postgresVectorDb.py:104-132):
    re-derive the reference behavior inline — per word, drop listed chars
    ('~' → space), single-space rejoin of the (possibly empty) words."""
    drop = ";,'-:\"#!@%&*()[]{}?+`|^"
    ref_words = []
    for w in s.split():
        for ch in drop:
            w = w.replace(ch, "")
        w = w.replace("~", " ")
        ref_words.append(w)
    assert kernels.strip_punctuation(s) == " ".join(ref_words)
