"""CDX index source tests (sources/cdx.py) — parsing, typed casts, digest
dedupe, SURT rule; the driver gate (`cdx_fetch_list`) re-derives everything
in DuckDB (json_extract + list_reverse SURT) over the synthetic shard."""

import json

from pyspark.sql import functions as F

from aiwhispr_spark.sources.cdx import (
    fetch_list,
    parse_cdx_lines,
    surt_key_expr,
)


def _line(surt, ts, **rec):
    return f"{surt} {ts} {json.dumps(rec)}"


def _parse(spark, lines):
    df = spark.createDataFrame([(ln,) for ln in lines], "value string")
    return parse_cdx_lines(df)


def test_parse_types_and_malformed_drop(spark):
    lines = [
        _line(
            "org,example)/p",
            "20240101000000",
            url="https://example.org/p",
            mime="text/html",
            status="200",
            digest="sha1:aa",
            length="123",
            offset="456",
            filename="f.warc.gz",
        ),
        "no json here",
        'com,bad)/x 20240101000001 {"url": not-json}',
    ]
    rows = _parse(spark, lines).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["status_i"] == 200
    assert r["length_l"] == 123 and r["offset_l"] == 456
    assert r["surt"] == "org,example)/p" and r["ts"] == "20240101000000"


def test_fetch_list_filters_and_keeps_earliest_per_digest(spark):
    def cap(ts, status="200", mime="text/html", digest="sha1:d1", url=None):
        return _line(
            "org,example)/p",
            ts,
            url=url or "https://example.org/p",
            mime=mime,
            status=status,
            digest=digest,
            length="1",
            offset="0",
            filename=f"w{ts[-2:]}.warc.gz",
        )

    lines = [
        cap("20240101000005"),                      # later duplicate
        cap("20240101000001"),                      # earliest -> kept
        cap("20240101000000", status="404"),        # excluded, though earliest
        cap("20240101000002", mime="application/pdf"),  # excluded
        cap("20240101000003", digest="sha1:d2"),    # second digest
    ]
    out = {r["digest"]: r for r in fetch_list(_parse(spark, lines)).collect()}
    assert set(out) == {"sha1:d1", "sha1:d2"}
    assert out["sha1:d1"]["ts"] == "20240101000001"
    assert out["sha1:d1"]["filename"] == "w01.warc.gz"


def test_surt_rule(spark):
    cases = [
        ("https://www.Sub.Example.ORG/Page/1", "org,example,sub,www)/page/1"),
        ("https://h.org", "org,h)/"),                    # no path -> '/'
        ("https://h.org:8080/a", "org,h)/a"),            # port dropped
        ("https://h.org/a?q=1#f", "org,h)/a"),           # query/fragment dropped
    ]
    df = spark.createDataFrame([(u,) for u, _ in cases], "url string")
    got = [
        r["s"] for r in df.select(surt_key_expr(F.col("url")).alias("s")).collect()
    ]
    assert got == [e for _, e in cases]


def test_no_python_stage(spark):
    df = spark.createDataFrame([("x y z",)], "value string")
    plan = parse_cdx_lines(df)._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan
