"""Arrow-vectorized UDFs wrapping the byte-compat kernels, and JVM-side
expression builders for everything that does NOT need Python-regex parity.

Design rule (SURVEY.md §7.3): anything whose bytes must match the reference's
Python regexes stays in pandas UDFs (Java regex differs on corner cases);
everything else — cosine, filters, projections, aggregations — is built-in
``pyspark.sql.functions`` so it compiles into whole-stage codegen.
No per-row Python anywhere (BASELINE.json input_hint).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import (
    ArrayType,
    FloatType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

from .. import kernels
from ..embedding import get_encoder
from ..triples import alias_shingles, extract_triples, normalize_alias

# --- T1-T4: regex kernels as scalar pandas UDFs --------------------------------------


@pandas_udf(StringType())
def clean_html_udf(html: pd.Series) -> pd.Series:
    """T1 over utf-8 `binary` html column → extracted text (byte-identical).

    cites extract_cleantext_from_html.py:5-10
    """
    return html.map(
        lambda b: kernels.clean_html(
            b.decode("utf-8") if isinstance(b, (bytes, bytearray)) else (b or "")
        ),
        na_action="ignore",
    ).fillna("")


@pandas_udf(StringType())
def clean_text_udf(text: pd.Series) -> pd.Series:
    """T1 over an already-decoded string column."""
    return text.map(kernels.clean_html, na_action="ignore")


@pandas_udf(StringType())
def clean_text_se_udf(text: pd.Series) -> pd.Series:
    """T4 stackexchange clean variant. cites stackexchangeContentSite.py:46-49"""
    return text.map(kernels.clean_html_se, na_action="ignore")


@pandas_udf(ArrayType(StringType()))
def extract_codeblocks_udf(text: pd.Series) -> pd.Series:
    """T2. cites extract_codeblocks_from_html.py:12-29"""
    return text.map(kernels.extract_codeblocks, na_action="ignore")


@pandas_udf(StringType())
def replace_codeblocks_udf(text: pd.Series, n: pd.Series) -> pd.Series:
    """T3. cites replace_codeblocks_from_html.py:12-24"""
    return pd.Series(
        [
            None if t is None else kernels.replace_codeblocks(t, int(k))
            for t, k in zip(text, n)
        ]
    )


@pandas_udf(StringType())
def display_url_udf(prefix: pd.Series, path: pd.Series) -> pd.Series:
    """T9 display-URL quoting. cites searchService.py:153-156"""
    return pd.Series(
        [
            None if (a is None or b is None) else kernels.display_url(a, b)
            for a, b in zip(prefix, path)
        ]
    )


@pandas_udf(StringType())
def validate_chunk_udf(text: pd.Series) -> pd.Series:
    """T5/T6 sentence language filter. cites aiwhisprBaseClasses.py:460-486"""
    return text.map(kernels.validate_text_chunk, na_action="ignore")


@pandas_udf(StringType())
def strip_punctuation_udf(text: pd.Series) -> pd.Series:
    """T7. cites postgresVectorDb.py:104-132,351-361"""
    return text.map(kernels.strip_punctuation, na_action="ignore")


# --- C1: chunker as mapInPandas ------------------------------------------------------

CHUNK_SCHEMA = StructType(
    [
        StructField("url", StringType()),
        StructField("chunk_no", IntegerType()),
        StructField("text_chunk", StringType()),
    ]
)


def chunk_documents(
    df: DataFrame,
    text_col: str = "text",
    url_col: str = "url",
    chunksize: int = kernels.TXTCHUNKSIZE,
    validate: bool = True,
    doc_acc=None,
    chunk_acc=None,
) -> DataFrame:
    """C1 bucket-fill chunker (aiwhisprBaseClasses.py:589-692) as mapInPandas.

    Per-document independent ⇒ embarrassingly parallel, NO shuffle: each input
    partition maps straight to chunk rows.  Numbering comes from the algorithm
    (1-based), not row position (SURVEY.md §2.4).  Optional accumulators count
    docs/chunks seen on executors (the reference's SQLite status counters).
    """
    cols = [url_col, text_col]

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            urls: list[str] = []
            nos: list[int] = []
            texts: list[str] = []
            for url, text in zip(pdf[url_col], pdf[text_col]):
                if text is None:
                    continue
                for j, chunk in enumerate(
                    kernels.bucket_fill_chunks(text, chunksize, validate=validate)
                ):
                    urls.append(url)
                    nos.append(j + 1)
                    texts.append(chunk)
            if doc_acc is not None:
                doc_acc.add(len(pdf))
            if chunk_acc is not None:
                chunk_acc.add(len(urls))
            yield pd.DataFrame({"url": urls, "chunk_no": nos, "text_chunk": texts})

    return df.select(*cols).mapInPandas(gen, CHUNK_SCHEMA)


# --- E3: triple extraction as mapInPandas --------------------------------------------

TRIPLE_SCHEMA = StructType(
    [
        StructField("url", StringType()),
        StructField("chunk_no", IntegerType()),
        StructField("subj", StringType()),
        StructField("pred", StringType()),
        StructField("obj", StringType()),
    ]
)


def extract_triples_df(
    df: DataFrame, text_col: str = "text_chunk", url_col: str = "url", triple_acc=None
) -> DataFrame:
    """E3 pattern OpenIE over chunk rows — narrow map, no shuffle."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"url": [], "chunk_no": [], "subj": [], "pred": [], "obj": []}
            for url, chunk_no, text in zip(pdf[url_col], pdf["chunk_no"], pdf[text_col]):
                if text is None:
                    continue
                for subj, pred, obj in extract_triples(text):
                    out["url"].append(url)
                    out["chunk_no"].append(int(chunk_no))
                    out["subj"].append(subj)
                    out["pred"].append(pred)
                    out["obj"].append(obj)
            if triple_acc is not None:
                triple_acc.add(len(out["url"]))
            yield pd.DataFrame(out)

    return df.select(url_col, "chunk_no", text_col).mapInPandas(gen, TRIPLE_SCHEMA)


def docs_to_triples_fused(
    df: DataFrame,
    html_col: str = "html",
    url_col: str = "url",
    chunksize: int = kernels.TXTCHUNKSIZE,
    doc_acc=None,
    chunk_acc=None,
    triple_acc=None,
) -> DataFrame:
    """E1+E2+E3 fused into ONE mapInPandas pass: extract (T1) → file-roundtrip
    → chunk (C1+T5) → triples, emitting triple rows directly.

    Why fused: each python eval node in a task pipeline is a separate worker
    process plus a full Arrow serialization of the intermediate stream.  Three
    chained stages triple the JVM↔Python traffic and the worker pool — measured
    2-3× wall-clock loss at local[32] on the unfused chain.  The composable
    stages (clean_html_udf / chunk_documents / extract_triples_df) remain for
    byte-identity tests and chunk materialization; this is the hot path.
    """
    from ..triples import extract_triples

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"url": [], "chunk_no": [], "subj": [], "pred": [], "obj": []}
            n_chunks = 0
            for url, html in zip(pdf[url_col], pdf[html_col]):
                if html is None:
                    continue
                raw = html.decode("utf-8") if isinstance(html, (bytes, bytearray)) else html
                text = kernels.file_roundtrip(kernels.clean_html(raw))
                for j, chunk in enumerate(kernels.bucket_fill_chunks(text, chunksize)):
                    n_chunks += 1
                    for subj, pred, obj in extract_triples(chunk):
                        out["url"].append(url)
                        out["chunk_no"].append(j + 1)
                        out["subj"].append(subj)
                        out["pred"].append(pred)
                        out["obj"].append(obj)
            if doc_acc is not None:
                doc_acc.add(len(pdf))
            if chunk_acc is not None:
                chunk_acc.add(n_chunks)
            if triple_acc is not None:
                triple_acc.add(len(out["url"]))
            yield pd.DataFrame(out)

    return df.select(url_col, html_col).mapInPandas(gen, TRIPLE_SCHEMA)


# --- E4: batch embedding -------------------------------------------------------------


class EncoderAuthError(Exception):
    """Fail-fast channel: the reference aborts immediately on auth/invalid-
    request errors instead of retrying (openaiLlmService.py:96-111)."""


def make_embed_udf(encoder_name: str = "hash64", max_attempts: int = 3, retry_sleep: float = 5.0):
    """Batch-encode pandas UDF; model resolved once per executor process
    (reference's per-chunk encode at filepathContentSite.py:135 becomes one
    Arrow batch per call — the 10-100× vectorization win).

    U2 retry semantics (openaiLlmService.py:67-134): transient encoder
    failures retry up to `max_attempts` with `retry_sleep` seconds between
    attempts; EncoderAuthError fails fast.  Spark's own task retries
    (spark.task.maxFailures) then wrap this as the outer layer."""

    @pandas_udf(ArrayType(FloatType()))
    def embed_udf(text: pd.Series) -> pd.Series:
        import time as _time

        # a callable ships in the closure (registry mutations on the driver
        # are invisible to python workers); a name resolves worker-side
        encoder = encoder_name if callable(encoder_name) else get_encoder(encoder_name)
        batch = text.fillna("").tolist()
        for attempt in range(max_attempts):
            try:
                mat = encoder(batch)
                break
            except EncoderAuthError:
                raise
            except Exception:
                if attempt == max_attempts - 1:
                    raise
                _time.sleep(retry_sleep)
        return pd.Series(list(mat))

    return embed_udf


embed_udf = make_embed_udf("hash64")


# --- alias normalization / shingles (E6 helpers) -------------------------------------


@pandas_udf(StringType())
def normalize_alias_udf(name: pd.Series) -> pd.Series:
    return name.map(normalize_alias, na_action="ignore")


@pandas_udf(ArrayType(StringType()))
def alias_shingles_udf(name: pd.Series) -> pd.Series:
    return name.map(alias_shingles, na_action="ignore")


# --- JVM-side expression builders (stay in codegen) ----------------------------------


def ws_tokens_expr(text: Column) -> Column:
    """Whitespace tokens of the trimmed, lowercased text; empty/blank input
    yields an EMPTY array (a bare split('') would yield ['']).  The one
    tokenizer the token-position operators (gazetteer, summarize) share —
    change it here, not in per-module copies."""
    t = F.trim(F.lower(text))
    return F.when(F.length(t) == 0, F.array().cast("array<string>")).otherwise(
        F.split(t, r"\s+")
    )


def bound(expr: Column, fn) -> Column:
    """Evaluate ``expr`` ONCE per row and hand it to ``fn`` as a lambda
    variable: ``bound(e, lambda t: body(t))``.

    This guards against the higher-order-function re-evaluation trap: a
    captured non-lambda expression inside a transform/filter/aggregate BODY
    is re-evaluated on every element (and in every sibling aggregate), so
    e.g. referencing ``split(text)`` inside a per-token lambda re-runs the
    split per token — O(tokens²) per document (measured: 24 multi-KB docs
    took 200+ s to shingle; bound, milliseconds).  Implementation: wrap the
    expression in a one-element array and transform over it, so Catalyst
    binds it to a lambda variable materialized once per row."""
    return F.element_at(F.transform(F.array(expr), fn), 1)


def cosine_expr(vec_col: str | Column, query: list[float]) -> Column:
    """Exact cosine similarity between an array<float> column and a constant
    query vector, entirely JVM-side (zip_with + aggregate) — the engine's Q1
    scoring kernel (cites qdrantVectorDb.py:129 Distance.COSINE;
    postgresVectorDb.py:477-493 `<=>`).  float64 math, sequential fold."""
    v = F.col(vec_col) if isinstance(vec_col, str) else vec_col
    q = F.lit(query).cast("array<double>")
    vd = v.cast("array<double>")
    dot = F.aggregate(F.zip_with(vd, q, lambda x, y: x * y), F.lit(0.0), lambda a, x: a + x)
    nv = F.sqrt(F.aggregate(vd, F.lit(0.0), lambda a, x: a + x * x))
    nq = float(sum(x * x for x in query)) ** 0.5
    return F.when(nv > 0, dot / (nv * F.lit(nq))).otherwise(F.lit(0.0))


def cosine_cols_expr(a: str | Column, b: str | Column) -> Column:
    """Exact cosine between two array<float> columns (JVM-side)."""
    av = (F.col(a) if isinstance(a, str) else a).cast("array<double>")
    bv = (F.col(b) if isinstance(b, str) else b).cast("array<double>")
    dot = F.aggregate(F.zip_with(av, bv, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x)
    na = F.sqrt(F.aggregate(av, F.lit(0.0), lambda acc, x: acc + x * x))
    nb = F.sqrt(F.aggregate(bv, F.lit(0.0), lambda acc, x: acc + x * x))
    return F.when((na > 0) & (nb > 0), dot / (na * nb)).otherwise(F.lit(0.0))


def truncate_display_expr(col: str | Column, limit: int = kernels.DISPLAY_TEXTSIZE) -> Column:
    """T8 as a pure expression (searchService.py:159-162)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.when(
        F.length(c) > limit, F.concat(F.substring(c, 1, limit - 3), F.lit("..."))
    ).otherwise(c)
