"""Byte-compatible text kernels.

Pure-Python, dependency-free re-implementations of the reference's text
semantics (prasaar/aiwhispr).  These functions are the single source of
truth for BOTH the distributed engine (applied batch-wise inside Arrow
pandas UDFs, see ``aiwhispr_spark.functions``) and the single-process
test oracle (``aiwhispr_spark.oracle``), so byte-identity between the
two is structural, and byte-identity against the *reference* is pinned
by golden unit tests (tests/test_kernels.py).

Reference semantics reproduced here (file:line are reference paths):

* T1  html → cleantext regex      python/common-functions/extract_cleantext_from_html.py:5-10
* T2  codeblock extraction        python/common-functions/extract_codeblocks_from_html.py:12-29
* T3  codeblock replacement       python/common-functions/replace_codeblocks_from_html.py:12-24
* T4  stackexchange clean variant python/content-site/stackexchangeContentSite.py:46-49
* T5  sentence language filter    python/base-classes/aiwhisprBaseClasses.py:460-486
* T6  latin1→utf-8 encoding fix   python/base-classes/aiwhisprBaseClasses.py:473-480
* T7  punctuation strip           python/vectordb/postgresVectorDb.py:104-132,351-361
* T8  display truncation          python/flask-app/searchService.py:159-162
* T9  display-URL quoting         python/flask-app/searchService.py:153-156
* C1  bucket-fill word chunker    python/base-classes/aiwhisprBaseClasses.py:589-692

They are written fresh from the observed semantics; the regex constants
must match the reference byte-for-byte (including the reference's
semicolon-less ``&lt;code&gt`` alternative — a quirk, kept on purpose).
"""

from __future__ import annotations

import re

# --- T1 / T2 / T3: the generic HTML clean regex -------------------------------------
# NB: the third alternative `&lt;code&gt` intentionally lacks the trailing `;`,
# matching the reference constant exactly (extract_cleantext_from_html.py:5).
CLEANR_PATTERN = (
    "&lt;pre&gt;|&lt;/pre&gt;|&lt;code&gt|&lt;/code&gt;|p&gt;|/p&gt;|&#xA;"
    "|<.*?>|&([a-z0-9]+|#[0-9]{1,6}|#x[0-9a-f]{1,6});"
)
CLEANR = re.compile(CLEANR_PATTERN)

# T4: the stackexchange variant drops the `&lt;pre&gt;…` alternatives
# (stackexchangeContentSite.py:46).
CLEANR_SE_PATTERN = "p&gt;|/p&gt;|&#xA;|<.*?>|&([a-z0-9]+|#[0-9]{1,6}|#x[0-9a-f]{1,6});"
CLEANR_SE = re.compile(CLEANR_SE_PATTERN)

_CODEBLOCK = re.compile(r"<code>(.*?)</code>", re.MULTILINE | re.DOTALL)

# default chunk size, aiwhisprConstants.py:4
TXTCHUNKSIZE = 700

# display truncation, aiwhisprConstants.py:31 / searchService.py:159-162
DISPLAY_TEXTSIZE = 500


def clean_html(raw_html: str) -> str:
    """T1: strip tags/entities with the reference regex (byte-identical)."""
    return CLEANR.sub("", raw_html)


def clean_html_se(raw_html: str) -> str:
    """T4: stackexchange clean variant."""
    return CLEANR_SE.sub("", raw_html)


def extract_codeblocks(text_in: str) -> list[str]:
    """T2: every ``<code>…</code>`` span (tags included in the match, as in
    the reference which cleans ``code_block.group()``), each run through T1."""
    return [clean_html(m.group()) for m in _CODEBLOCK.finditer(text_in)]


def replace_codeblocks(text_in: str, no_of_replacements: int) -> str:
    """T3: replace the i-th remaining ``<code>…</code>`` with ``[#CODEBLOCK][i]``.

    The reference passes ``re.MULTILINE|re.DOTALL`` as the *flags* positional
    of ``re.sub`` — which is actually the ``count``/``flags`` mix-up-safe
    call ``re.sub(pat, repl, s, count=1, flags=M|S)``; we reproduce the exact
    call shape (count=1 per iteration, M|S flags).
    """
    text_out = text_in
    for i in range(no_of_replacements):
        text_out = re.sub(
            r"<code>(.*?)</code>",
            "[#CODEBLOCK][" + str(i) + "]",
            text_out,
            count=1,
            flags=re.MULTILINE | re.DOTALL,
        )
    return text_out


# --- T5/T6: sentence-level language filter -----------------------------------------
# The reference uses spaCy en_core_web_sm + spacy-langdetect(seed=42).  Neither is
# installable in this sandbox, so the engine ships a deterministic rule-based
# detector behind the same interface (SURVEY.md §7.4); the real models remain
# pluggable.  Sentence segmentation approximates spaCy's: split after .!? followed
# by whitespace.  Detection: stopword evidence against tiny per-language lexicons.

_SENT_SPLIT = re.compile(r"(?<=[.!?])\s+")

_EN_STOP = frozenset(
    "the a an and or of to in is are was were be been it this that with for on as by "
    "at from he she they we you i his her its not no have has had do does did will "
    "would can could should there their who what which when where why how".split()
)
_DE_STOP = frozenset(
    "der die das und oder von zu in ist sind war waren sein es dies mit für auf als "
    "bei aus er sie wir ich sein ihre nicht kein haben hat hatte werden wird kann "
    "könnte sollte da wer was wann wo warum wie ein eine einen dem den des".split()
)
_FR_STOP = frozenset(
    "le la les et ou de du à dans est sont était étaient être il elle ils nous je "
    "vous son sa ses ne pas avoir a avait sera peut pourrait devrait qui que quand "
    "où pourquoi comment un une des au aux ce cette avec pour sur comme par chez".split()
)
_ES_STOP = frozenset(
    "el la los las y o de del a en es son era eran ser está esto con para sobre "
    "como por él ella ellos nosotros yo su sus no tener tiene tenía será puede "
    "quién qué cuándo dónde porqué cómo un una unos unas al lo se que".split()
)


# public view of the detector's evidence sets (oracle SQL generation)
STOPWORDS = {"en": _EN_STOP, "de": _DE_STOP, "fr": _FR_STOP, "es": _ES_STOP}


def split_sentences(text: str) -> list[str]:
    """Deterministic sentence segmenter (spaCy ``doc.sents`` stand-in)."""
    if not text:
        return []
    parts = _SENT_SPLIT.split(text)
    return [p for p in parts if p != ""]


def detect_sentence_lang(sentence: str) -> str:
    """Deterministic language-ID: majority stopword evidence; ties → 'en' iff
    English has any evidence, else the lexicographically-first max language,
    else 'en' for empty evidence (mirrors langdetect's en-bias on ASCII text)."""
    words = [w.strip(".,;:!?\"'()[]{}").lower() for w in sentence.split()]
    scores = {
        "en": sum(w in _EN_STOP for w in words),
        "de": sum(w in _DE_STOP for w in words),
        "fr": sum(w in _FR_STOP for w in words),
        "es": sum(w in _ES_STOP for w in words),
    }
    best = max(scores.values())
    if best == 0:
        return "en"
    if scores["en"] == best:
        return "en"
    for lang in sorted(scores):
        if scores[lang] == best:
            return lang
    return "en"


def fix_encoding(sentence: str) -> str:
    """T6: the reference's latin1 → utf-8 round-trip with iso-8859-1 fallback
    (aiwhisprBaseClasses.py:473-480).  Returns '' when both decodes fail."""
    try:
        return sentence.encode("latin1").decode("utf-8")
    except Exception:
        try:
            return sentence.encode("latin1").decode("iso-8859-1")
        except Exception:
            return ""


def validate_text_chunk(text_chunk: str) -> str:
    """T5: keep only sentences detected as English, re-encoded via T6, and
    concatenate survivors with NO separator (aiwhisprBaseClasses.py:465-486)."""
    out = ""
    for sent in split_sentences(text_chunk):
        if detect_sentence_lang(sent) == "en":
            out += fix_encoding(sent)
    return out


# --- T7: punctuation strip ----------------------------------------------------------

_PUNCT_TABLE = str.maketrans(
    {c: "" for c in ";,'-:\"#!@%&*()[]{}?+`|^"} | {"~": " "}
)


def remove_punctuations_word(word: str) -> str:
    """Per-word punctuation removal; '~' becomes a space (postgresVectorDb.py:104-132)."""
    return word.translate(_PUNCT_TABLE)


def strip_punctuation(text_chunk: str) -> str:
    """T7 applied as at postgresVectorDb.py:351-361: split on whitespace, strip
    each word, re-join with single spaces (words emptied by stripping remain as
    empty strings, producing doubled spaces — reference-faithful)."""
    words = text_chunk.split()
    return " ".join(remove_punctuations_word(w) for w in words)


def truncate_display(text: str, limit: int = DISPLAY_TEXTSIZE) -> str:
    """T8: texts longer than `limit` are cut to limit-3 chars + '...'."""
    if len(text) > limit:
        return text[: limit - 3] + "..."
    return text


def display_url(src_path_for_results: str, content_path: str) -> str:
    """T9: the search-result display URL (searchService.py:153-156): http-ish
    prefixes get ``quote_plus(prefix, safe='/:') + '/' + quote(path)``;
    anything else is plain concatenation."""
    import urllib.parse

    if src_path_for_results[0:4] == "http":
        return (
            urllib.parse.quote_plus(src_path_for_results, safe="/:")
            + "/"
            + urllib.parse.quote(content_path)
        )
    return src_path_for_results + "/" + content_path


def file_roundtrip(text: str) -> str:
    """The reference materializes extracted text to a file with the locale
    default (utf-8) and re-reads it with ``encoding='ISO-8859-1'``
    (aiwhisprBaseClasses.py:607) — so the chunker sees mojibake for any
    non-ASCII char, which T6's latin1→utf-8 round-trip later restores.
    This emulates that disk hop in memory (total function: every byte decodes
    under Python's iso-8859-1)."""
    return text.encode("utf-8").decode("iso-8859-1")


# --- C1: bucket-fill word chunker ----------------------------------------------------


def bucket_fill_chunks(text: str, chunksize: int = 0, validate: bool = True) -> list[str]:
    """C1: the reference's bucket-fill chunker (aiwhisprBaseClasses.py:589-692),
    re-expressed over an in-memory string instead of files.

    Faithful to the reference control flow, including its quirks:

    * whole-line fill prepends ``' '`` before the line; word-by-word fill appends
      ``' '`` after each word (whitespace asymmetry, :630 vs :656);
    * leftover words after a mid-line chunk boundary are re-joined with trailing
      spaces into ``current_line``;
    * on a second consecutive word-by-word pass for the *same* oversized line the
      reference re-reads the stale ``words_in_the_current_line`` list from index 0
      (it only rebuilds ``current_line``/the count, not the word list,
      :670-677) — reproduced verbatim because byte-parity is the contract;
    * chunk numbering starts at 1 (list index 0 ⇒ chunk_no 1);
    * each emitted chunk passes through the T5 language validator exactly as
      ``saveTextChunk`` does (:579-585) unless ``validate=False``.

    The reference reads the extracted-text file with ``newline="\\n"`` and
    ISO-8859-1; here ``text`` is already a str and we split on ``"\\n"`` which
    preserves the same line stream for files the reference would produce.
    """
    if chunksize == 0:
        chunksize = TXTCHUNKSIZE

    def _emit(chunk: str) -> str:
        return validate_text_chunk(chunk) if validate else chunk

    chunks: list[str] = []
    current_text_chunk = ""
    current_line = ""
    word_ctr = 0

    for raw_line in text.split("\n"):
        newline = raw_line.rstrip()
        current_line = current_line + newline
        words_in_line = current_line.split()
        n_words = len(words_in_line)

        while word_ctr <= chunksize and n_words > 0:
            if word_ctr + n_words <= chunksize:
                # whole-line fill: leading space before the line (:630)
                current_text_chunk = current_text_chunk + " " + current_line
                word_ctr += n_words
                current_line = ""
                n_words = 0
                if word_ctr == chunksize:
                    chunks.append(_emit(current_text_chunk))
                    current_text_chunk = ""
                    word_ctr = 0
            else:
                # word-by-word fill: trailing space after each word (:656)
                i = 0
                while word_ctr <= chunksize and i < n_words:
                    current_text_chunk = current_text_chunk + words_in_line[i] + " "
                    i += 1
                    word_ctr += 1
                    if word_ctr == chunksize:
                        chunks.append(_emit(current_text_chunk))
                        current_text_chunk = ""
                        word_ctr = 0
                        # rebuild current_line from the leftover words with
                        # trailing spaces; the word LIST is intentionally left
                        # stale (reference :670-677)
                        current_line = ""
                        new_n = 0
                        while i < n_words:
                            current_line = current_line + words_in_line[i] + " "
                            i += 1
                            new_n += 1
                        n_words = new_n

    if len(current_text_chunk) > 0:
        chunks.append(_emit(current_text_chunk))
    return chunks
