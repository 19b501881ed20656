"""WARC source gates (sources/warc.py): pure-python record parsing, the
Spark binaryFile→mapInPandas reader, and the parquet↔WARC round-trip that
also backs the `warc_roundtrip_extract` driver gate."""

import datetime as dt
import gzip

import pytest

from aiwhispr_spark.sources.warc import (
    build_record,
    parse_warc_bytes,
    read_warc,
    write_warc,
    write_warc_from_parquet,
)

TS = dt.datetime(2024, 3, 1, 12, 0, 7)


def test_parse_single_record_roundtrip():
    rec = build_record("https://x.org/a", TS, b"<html>hi</html>")
    out = list(parse_warc_bytes(rec))
    assert out == [("https://x.org/a", TS, b"<html>hi</html>")]


def test_parse_concatenated_and_gzipped_members():
    raw = build_record("https://x.org/a", TS, b"A" * 100) + build_record(
        "https://x.org/b", TS, b"B"
    )
    assert [u for u, _, _ in parse_warc_bytes(raw)] == [
        "https://x.org/a",
        "https://x.org/b",
    ]
    # per-record gzip members concatenated (the Common-Crawl layout)
    gz = gzip.compress(
        build_record("https://x.org/a", TS, b"A" * 100), mtime=0
    ) + gzip.compress(build_record("https://x.org/b", TS, b"B"), mtime=0)
    assert [u for u, _, _ in parse_warc_bytes(gz)] == [
        "https://x.org/a",
        "https://x.org/b",
    ]


def test_parse_skips_non_response_records():
    info = (
        b"WARC/1.0\r\nWARC-Type: warcinfo\r\nContent-Length: 4\r\n\r\nabcd\r\n\r\n"
    )
    rec = build_record("https://x.org/a", TS, b"body")
    assert [u for u, _, _ in parse_warc_bytes(info + rec)] == ["https://x.org/a"]


def test_parse_truncated_payload_raises():
    rec = build_record("https://x.org/a", TS, b"0123456789")
    with pytest.raises(ValueError, match="truncated"):
        list(parse_warc_bytes(rec[:-20]))


def test_parse_bad_version_line_raises():
    with pytest.raises(ValueError, match="version"):
        list(parse_warc_bytes(b"HTTP/1.1 200 OK\r\n\r\n"))


def test_http_header_stripped_binary_body_preserved():
    body = bytes(range(256))  # non-utf8 body must survive byte-exact
    rec = build_record("https://x.org/bin", TS, body)
    (_, _, html), = parse_warc_bytes(rec)
    assert html == body


@pytest.fixture(scope="module")
def warc_corpus(tmp_path_factory):
    from aiwhispr_spark.sources.synthetic import write_simple_corpus_parquet

    d = tmp_path_factory.mktemp("warc")
    pq = write_simple_corpus_parquet(str(d / "docs.parquet"), n_docs=40)
    out = write_warc_from_parquet(pq, str(d / "crawl"), n_files=3)
    return pq, out


def test_spark_reader_roundtrips_parquet(spark, warc_corpus):
    pq, warc_dir = warc_corpus
    got = read_warc(spark, warc_dir)
    want = spark.read.parquet(pq).select("url", "warc_ts", "html")
    g = {
        (r.url, r.warc_ts, bytes(r.html))
        for r in got.collect()
    }
    w = {
        (r.url, r.warc_ts, bytes(r.html))
        for r in want.collect()
    }
    assert g == w and len(g) == 40


def test_spark_reader_one_task_per_file(spark, warc_corpus):
    _, warc_dir = warc_corpus
    assert read_warc(spark, warc_dir).rdd.getNumPartitions() == 3


def test_incremental_chunked_parsing_matches_whole_buffer():
    # iter_warc_records must assemble records across arbitrary chunk
    # boundaries (the streaming contract: only the in-flight record buffers)
    import datetime as dt

    from aiwhispr_spark.sources.warc import build_record, iter_warc_records

    recs = [
        (f"https://s.org/{i}", dt.datetime(2023, 1, 1, 0, 0, i), b"x" * (100 + i))
        for i in range(5)
    ]
    raw = b"".join(build_record(*r) for r in recs)
    for chunk in (1, 7, 64, len(raw)):
        chunks = [raw[i : i + chunk] for i in range(0, len(raw), chunk)]
        assert list(iter_warc_records(chunks)) == recs


def test_oversized_gzip_member_drains_in_bounded_pieces():
    import datetime as dt
    import gzip

    from aiwhispr_spark.sources.warc import build_record, parse_warc_bytes

    # one member > the 1 MiB drain cap forces the unconsumed_tail loop
    big = build_record("https://s.org/big", dt.datetime(2023, 1, 1), b"y" * (3 << 20))
    out = list(parse_warc_bytes(gzip.compress(big, mtime=0)))
    assert len(out) == 1 and len(out[0][2]) == 3 << 20
