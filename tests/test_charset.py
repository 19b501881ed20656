"""Charset detection + decode tests (operators/charset.py); the driver gate
(`charset_detect_decode`) checks decoded bytes closed-form via md5."""

import pyspark.sql.functions as F

from aiwhispr_spark.operators.charset import decode_payloads, detect_charset_expr

BODY = "naïve café résumé test body"


def _detect(spark, payload: bytes) -> str:
    df = spark.createDataFrame([(bytearray(payload),)], "payload binary")
    return df.select(detect_charset_expr(F.col("payload")).alias("c")).first()["c"]


def test_bom_detection_beats_meta(spark):
    p = b"\xef\xbb\xbf" + '<meta charset="latin-1">x'.encode()
    assert _detect(spark, p) == "utf-8"
    assert _detect(spark, "x".encode("utf-16")) == "utf-16le"
    # the utf-16-be codec emits no BOM itself — prepend it explicitly
    assert _detect(spark, b"\xfe\xff" + "x".encode("utf-16-be")) == "utf-16be"


def test_meta_variants_detected(spark):
    assert _detect(spark, b'<META CHARSET="Windows-1252">') == "windows-1252"
    assert (
        _detect(
            spark,
            b'<meta http-equiv="Content-Type" content="text/html; charset=iso-8859-1">',
        )
        == "iso-8859-1"
    )
    assert _detect(spark, b"<meta charset=utf-8>") == "utf-8"


def test_no_signal_falls_back_utf8(spark):
    assert _detect(spark, b"<p>plain ascii") == "utf-8"


def _decode_one(spark, payload: bytes):
    df = spark.createDataFrame(
        [(1, bytearray(payload))], "doc_id long, payload binary"
    )
    return decode_payloads(df).first()


def test_decode_cp1252_and_utf16_roundtrip(spark):
    r = _decode_one(
        spark, f'<meta charset="windows-1252">{BODY}'.encode("cp1252")
    )
    assert r["charset"] == "windows-1252" and r["text"].endswith(BODY)
    r16 = _decode_one(spark, BODY.encode("utf-16"))
    assert r16["charset"] == "utf-16le" and r16["text"] == BODY
    assert r16["bom_i"] == 1


def test_utf8_bom_stripped(spark):
    r = _decode_one(spark, b"\xef\xbb\xbf" + BODY.encode("utf-8"))
    assert r["text"] == BODY and r["bom_i"] == 1


def test_unknown_charset_degrades_to_replace_not_crash(spark):
    r = _decode_one(spark, b'<meta charset="x-no-such-cs">\xff\xfe\xfdzz')
    assert r["charset"] == "x-no-such-cs"
    assert "zz" in r["text"]  # replacement decode, job survives


def test_invalid_declared_bytes_fall_back(spark):
    # declared utf-8 but bytes are invalid utf-8 -> replace, not crash
    r = _decode_one(spark, b'<meta charset="utf-8">ok\xff\xfe')
    assert "ok" in r["text"]


def test_null_payload_yields_null_text_not_crash(spark):
    df = spark.createDataFrame(
        [(1, bytearray(BODY.encode())), (2, None)],
        "doc_id long, payload binary",
    )
    rows = {r["doc_id"]: r for r in decode_payloads(df).collect()}
    assert rows[1]["text"] == BODY
    assert rows[2]["text"] is None
