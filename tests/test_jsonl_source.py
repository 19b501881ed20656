"""JSONL source tests (sources/jsonl.py): explicit-schema PERMISSIVE read —
malformed lines must survive as _corrupt_record rows, never kill the job, and
good rows must round-trip bytes exactly (unicode, embedded quotes/newlines).
"""

import json
import os

from pyspark.sql import functions as F

from aiwhispr_spark.sources.jsonl import read_jsonl, write_jsonl_fixture


def test_fixture_roundtrip_and_corrupt_isolation(spark, tmp_path):
    path = write_jsonl_fixture(str(tmp_path / "docs.jsonl"), n_docs=50)
    # Spark disallows querying ONLY _corrupt_record from a raw JSON scan
    # (QUERY_ONLY_CORRUPT_RECORD_COLUMN) — cache the parsed frame first.
    df = read_jsonl(spark, path).cache()
    bad = df.where(F.col("_corrupt_record").isNotNull())
    good = df.where(F.col("_corrupt_record").isNull())
    # exactly the one malformed trailer line lands in _corrupt_record
    assert bad.count() == 1
    assert "broken-not-json" in bad.first()["_corrupt_record"]
    assert good.count() == 50
    # byte-exact text round trip against a plain-python json read
    exp = {}
    with open(path, encoding="utf-8") as f:
        for line in f:
            try:
                rec = json.loads(line)
            except json.JSONDecodeError:
                continue
            exp[rec["doc_id"]] = (rec["lang"], rec["text"])
    got = {
        r["doc_id"]: (r["lang"], r["text"])
        for r in good.select("doc_id", "lang", "text").collect()
    }
    assert got == exp
    # the fixture actually exercises the hard cases
    assert any('"' in t for _, t in exp.values())
    assert any("\n" in t for _, t in exp.values())
    assert any("café" in t for _, t in exp.values())


def test_fixture_is_idempotent(tmp_path):
    path = str(tmp_path / "docs.jsonl")
    write_jsonl_fixture(path, n_docs=10)
    size1 = os.path.getsize(path)
    write_jsonl_fixture(path, n_docs=10)
    assert os.path.getsize(path) == size1


def test_schema_is_explicit_not_inferred(spark, tmp_path):
    # a field absent from the schema is simply dropped, not inferred
    path = str(tmp_path / "extra.jsonl")
    with open(path, "w", encoding="utf-8") as f:
        f.write('{"doc_id": 1, "lang": "en", "text": "a", "surprise": 9}\n')
    df = read_jsonl(spark, path)
    assert set(df.columns) == {"doc_id", "lang", "text", "_corrupt_record"}
    r = df.first()
    assert r["doc_id"] == 1 and r["_corrupt_record"] is None
