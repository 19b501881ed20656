"""Common-Crawl CDX(J) index source — the discovery half of a WARC pipeline.

A CDX-JSON line is ``<SURT key> <14-digit timestamp> <JSON blob>``; the blob
carries url/mime/status/digest and the (filename, offset, length) byte range
of the record inside its WARC file.  A crawler-side pipeline reads the index
FIRST and fetches only the ranges it wants — at 100 TB this is the difference
between scanning every WARC byte and reading a few percent of them (the repo's
``sources/warc.py`` consumes the files this op selects).

Spark-first: ``spark.read.text`` → one JVM regex split + ``from_json`` with
an EXPLICIT schema (the jsonl rule: inference is an extra full pass) — no
python stage anywhere.  CC ships the index as ~300 gzip shards per crawl:
gzip is not splittable, so parallelism = shard count (the dirs-of-files
rule, sources/jsonl.py).

SURT here is the simplified form: host labels reversed and comma-joined +
``)`` + lowercased path, query/fragment and port dropped, no ``www``
stripping — one documented canonical rule applied identically in the engine
and the oracle.

Reference parity: none (the reference never crawls) — web-curation tier
addition, SURVEY §2.8.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

CDX_LINE_RE = r"^(\S+) (\d{14}) (\{.*\})$"
CDX_JSON_SCHEMA = (
    "url string, mime string, status string, digest string,"
    " length string, offset string, filename string"
)
def surt_key_expr(url: Column) -> Column:
    """Simplified SURT key of a URL: reversed host labels + ')' + lower
    path ('/' when absent).  Host/path splitting is the shared
    urlnorm contract (url_host_expr / url_path_expr)."""
    from aiwhispr_spark.operators.urlnorm import url_host_expr, url_path_expr

    host = url_host_expr(url)
    path = F.lower(url_path_expr(url))
    return F.concat(
        F.array_join(F.reverse(F.split(host, r"\.")), ","), F.lit(")"), path
    )


def parse_cdx_lines(df: DataFrame, line_col: str = "value") -> DataFrame:
    """Raw CDX lines → typed rows (surt, ts, url, mime, status_i, digest,
    length_l, offset_l, filename).  Malformed lines (no 3-part shape, or
    unparseable JSON) are dropped — count them upstream as an ingest metric
    by diffing row counts."""
    line = F.col(line_col)
    parts = df.select(
        F.regexp_extract(line, CDX_LINE_RE, 1).alias("surt"),
        F.regexp_extract(line, CDX_LINE_RE, 2).alias("ts"),
        F.regexp_extract(line, CDX_LINE_RE, 3).alias("j"),
    ).where(F.col("surt") != "")
    parsed = parts.select(
        "surt", "ts", F.from_json("j", CDX_JSON_SCHEMA).alias("r")
    ).where(F.col("r").isNotNull() & F.col("r.url").isNotNull())
    return parsed.select(
        "surt",
        "ts",
        F.col("r.url").alias("url"),
        F.col("r.mime").alias("mime"),
        F.col("r.status").cast("int").alias("status_i"),
        F.col("r.digest").alias("digest"),
        F.col("r.length").cast("long").alias("length_l"),
        F.col("r.offset").cast("long").alias("offset_l"),
        F.col("r.filename").alias("filename"),
    )


def read_cdx(spark: SparkSession, path: str) -> DataFrame:
    """Read CDX-JSON shard file(s) into typed rows."""
    return parse_cdx_lines(spark.read.text(path))


def fetch_list(
    cdx: DataFrame,
    mime: str = "text/html",
) -> DataFrame:
    """Select the WARC byte ranges worth fetching: HTTP 200 + wanted mime,
    ONE capture per content digest (the earliest (ts, url) — re-crawls of
    identical bytes are index noise).  Returns (digest, ts, surt, url,
    filename, offset_l, length_l).

    100 TB shape: the digest dedupe is one groupBy carrying a short struct
    (never page bytes); map-side combine collapses same-digest captures
    within a shard before the exchange."""
    wanted = cdx.where((F.col("status_i") == 200) & (F.col("mime") == mime))
    best = wanted.groupBy("digest").agg(
        F.min(
            F.struct("ts", "url", "surt", "filename", "offset_l", "length_l")
        ).alias("b")
    )
    return best.select(
        "digest",
        F.col("b.ts").alias("ts"),
        F.col("b.surt").alias("surt"),
        F.col("b.url").alias("url"),
        F.col("b.filename").alias("filename"),
        F.col("b.offset_l").alias("offset_l"),
        F.col("b.length_l").alias("length_l"),
    )
