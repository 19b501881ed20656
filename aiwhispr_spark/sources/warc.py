"""Minimal WARC (ISO 28500) source: the actual Common-Crawl interchange
format, so the engine can ingest a crawl's ``*.warc.gz`` files directly
instead of requiring a pre-built parquet/Iceberg table.

The reference ingests filesystem/S3 blobs one file at a time
(`python/base-classes/aiwhisprBaseClasses.py` siteAuth/srcDocProcessor); a
CC-scale KG build starts from WARC, so this is the missing first hop.  Only
public format knowledge is used (the WARC 1.0/1.1 spec).

Spark shape
-----------
``spark.read.format("binaryFile")`` lists the files and hands each one to a
single task (binaryFile is deliberately non-splittable — matching reality:
a gzipped WARC member stream cannot be split mid-file).  Parallelism comes
from the FILE COUNT, exactly as in a real crawl (Common Crawl publishes
~90k WARC files per monthly snapshot, ~1 GiB each — ample tasks for any
cluster).  Parsing runs in ``mapInPandas`` so each task streams records out
in Arrow batches without materializing python row objects per record.

Writer (`write_warc` / `write_warc_from_parquet`) is driver-side fixture
tooling: tests and gates build small WARC dirs from the synthetic corpus and
round-trip them through the reader.
"""

from __future__ import annotations

import datetime as dt
import gzip
import hashlib
import os
import zlib
from typing import Iterable, Iterator

from pyspark.sql import DataFrame, SparkSession

_GZIP_MAGIC = b"\x1f\x8b"
_WARC_TS_FMT = "%Y-%m-%dT%H:%M:%SZ"

# (url:string, warc_ts:timestamp, html:binary) — the input_hint's column
# names, so downstream pipeline stages are source-agnostic.
READ_SCHEMA = "url string, warc_ts timestamp, html binary"


def _http_response_bytes(body: bytes) -> bytes:
    head = (
        b"HTTP/1.1 200 OK\r\n"
        b"Content-Type: text/html; charset=UTF-8\r\n"
        b"Content-Length: " + str(len(body)).encode("ascii") + b"\r\n\r\n"
    )
    return head + body


def build_record(url: str, ts: dt.datetime, html: bytes) -> bytes:
    """One WARC/1.0 ``response`` record (uncompressed bytes).

    Record ids are content-derived (md5 of url+ts) so fixture output is
    byte-deterministic across runs — same discipline as T10's content-derived
    chunk ids."""
    payload = _http_response_bytes(html)
    rid = hashlib.md5((url + "|" + ts.strftime(_WARC_TS_FMT)).encode()).hexdigest()
    head = (
        "WARC/1.0\r\n"
        f"WARC-Type: response\r\n"
        f"WARC-Record-ID: <urn:uuid:{rid}>\r\n"
        f"WARC-Date: {ts.strftime(_WARC_TS_FMT)}\r\n"
        f"WARC-Target-URI: {url}\r\n"
        "Content-Type: application/http; msgtype=response\r\n"
        f"Content-Length: {len(payload)}\r\n"
        "\r\n"
    ).encode("utf-8")
    return head + payload + b"\r\n\r\n"


def write_warc(
    rows: Iterable[tuple[str, dt.datetime, bytes]],
    path: str,
    compress: bool = True,
) -> str:
    """Write one WARC file (optionally gzip, one member per record — the
    Common-Crawl layout, which lets a reader skip to any member boundary)."""
    with open(path, "wb") as f:
        for url, ts, html in rows:
            rec = build_record(url, ts, html)
            f.write(gzip.compress(rec, mtime=0) if compress else rec)
    return path


def write_warc_from_parquet(
    parquet_path: str, out_dir: str, n_files: int = 4, compress: bool = True
) -> str:
    """Fixture tooling: shard a (url, warc_ts, html) parquet corpus into
    ``n_files`` WARC files under ``out_dir`` (row i → file i % n_files, so
    every shard is non-empty and the assignment is deterministic)."""
    import pyarrow.parquet as pq

    tbl = pq.read_table(parquet_path, columns=["url", "warc_ts", "html"])
    rows = list(
        zip(
            tbl.column("url").to_pylist(),
            tbl.column("warc_ts").to_pylist(),
            tbl.column("html").to_pylist(),
        )
    )
    os.makedirs(out_dir, exist_ok=True)
    ext = "warc.gz" if compress else "warc"
    for i in range(n_files):
        shard = [r for j, r in enumerate(rows) if j % n_files == i]
        write_warc(shard, os.path.join(out_dir, f"crawl-{i:05d}.{ext}"), compress)
    return out_dir


def _gzip_member_chunks(data: bytes) -> Iterator[bytes]:
    """Decompress a (possibly multi-member) gzip byte string INCREMENTALLY:
    one member's output at a time, never the whole archive.  With the CC
    one-member-per-record layout, peak live memory is the compressed input
    (binaryFile already holds it) plus one record."""
    chunk_cap = 1 << 20
    pos = 0
    while pos < len(data):
        d = zlib.decompressobj(wbits=31)
        yield d.decompress(data[pos:], chunk_cap)
        while not d.eof:  # oversized member: drain it in bounded pieces
            tail = d.unconsumed_tail
            if not tail:
                raise ValueError(f"truncated gzip member at byte {pos}")
            yield d.decompress(tail, chunk_cap)
        consumed = len(data) - pos - len(d.unused_data)
        if consumed <= 0:
            raise ValueError(f"gzip member at byte {pos} consumed no input")
        pos += consumed


def iter_warc_records(
    chunks: Iterable[bytes],
) -> Iterator[tuple[str, dt.datetime, bytes]]:
    """Yield (url, ts, html) from a stream of raw WARC byte chunks, buffering
    only the record currently being assembled (consumed prefixes are trimmed).

    Only ``response`` records with an HTTP payload yield rows; request/
    metadata/warcinfo records are skipped, as are records missing a target
    URI.  Malformed tails raise — a truncated crawl file should fail the
    task loudly, not silently drop records."""
    buf = bytearray()

    def _parse_available() -> Iterator[tuple[str, dt.datetime, bytes]]:
        pos = 0
        while True:
            while buf[pos : pos + 2] == b"\r\n":  # inter-record CRLFs
                pos += 2
            head_end = buf.find(b"\r\n\r\n", pos)
            if head_end < 0:
                break
            head = bytes(buf[pos:head_end]).decode("utf-8", "replace")
            lines = head.split("\r\n")
            if not lines[0].startswith("WARC/"):
                raise ValueError(f"bad WARC version line: {lines[0]!r}")
            fields: dict[str, str] = {}
            for ln in lines[1:]:
                k, _, v = ln.partition(":")
                fields[k.strip().lower()] = v.strip()
            try:
                length = int(fields["content-length"])
            except (KeyError, ValueError):
                raise ValueError("WARC record lacks Content-Length")
            if len(buf) < head_end + 4 + length:
                break  # payload not fully buffered yet
            body = bytes(buf[head_end + 4 : head_end + 4 + length])
            pos = head_end + 4 + length
            if fields.get("warc-type") == "response" and "warc-target-uri" in fields:
                http_end = body.find(b"\r\n\r\n")
                html = body[http_end + 4 :] if http_end >= 0 else body
                ts = dt.datetime.strptime(fields["warc-date"], _WARC_TS_FMT)
                yield fields["warc-target-uri"], ts, html
        del buf[:pos]

    for chunk in chunks:
        buf += chunk
        yield from _parse_available()
    yield from _parse_available()
    if buf.strip(b"\r\n"):
        raise ValueError(f"truncated WARC record in final {len(buf)} buffered bytes")


def parse_warc_bytes(data: bytes) -> Iterator[tuple[str, dt.datetime, bytes]]:
    """Yield (url, ts, html) from one WARC file's raw bytes (plain or
    gzipped); gzip input decompresses member-by-member, record parsing is
    incremental — see :func:`iter_warc_records`."""
    chunks = _gzip_member_chunks(data) if data[:2] == _GZIP_MAGIC else iter((data,))
    return iter_warc_records(chunks)


def read_warc(spark: SparkSession, path: str) -> DataFrame:
    """Scan a directory/glob of ``*.warc`` / ``*.warc.gz`` files into the
    input_hint frame (url, warc_ts, html).

    One task per file (binaryFile is non-splittable — inherent to the gzip
    member stream); at crawl scale the tens of thousands of files ARE the
    parallelism, so no repartition here — callers repartition downstream if
    their file count underfills the cluster."""
    import pandas as pd

    files = spark.read.format("binaryFile").load(path).select("content")
    batch_rows = 1024  # bounds each Arrow batch well under the 2 GiB offset limit

    def _to_pdf(recs: list[tuple[str, dt.datetime, bytes]]) -> "pd.DataFrame":
        return pd.DataFrame(
            {
                "url": [r[0] for r in recs],
                "warc_ts": pd.Series([r[1] for r in recs], dtype="datetime64[us]"),
                "html": [r[2] for r in recs],
            }
        )

    def parse(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            for content in pdf["content"]:
                recs: list[tuple[str, dt.datetime, bytes]] = []
                for rec in parse_warc_bytes(bytes(content)):
                    recs.append(rec)
                    if len(recs) >= batch_rows:
                        yield _to_pdf(recs)
                        recs = []
                if recs:
                    yield _to_pdf(recs)

    return files.mapInPandas(parse, schema=READ_SCHEMA)
