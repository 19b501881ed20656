"""U2 retry semantics (openaiLlmService.py:67-134): transient encoder errors
retry up to 3 attempts; auth errors fail fast with NO retry.  Attempt counts
are observed through a scratch file the worker-side encoder appends to."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from aiwhispr_spark.functions.udfs import EncoderAuthError, make_embed_udf


def _one_row(spark):
    return spark.createDataFrame([("hello world",)], "text string").coalesce(1)


def test_transient_errors_retry_then_succeed(spark, tmp_path):
    log = str(tmp_path / "attempts.log")

    def flaky(batch, _log=log):
        from aiwhispr_spark.embedding import hash_embed_texts

        with open(_log, "a") as f:
            f.write("attempt\n")
        with open(_log) as f:
            n = len(f.readlines())
        if n <= 2:
            raise RuntimeError("transient upstream error")
        return hash_embed_texts(batch)

    udf = make_embed_udf(flaky, retry_sleep=0.0)
    rows = _one_row(spark).select(udf(F.col("text")).alias("v")).collect()
    assert len(rows[0]["v"]) == 64
    with open(log) as f:
        assert len(f.readlines()) == 3  # failed twice, succeeded third


def test_auth_errors_fail_fast(spark, tmp_path):
    log = str(tmp_path / "auth.log")

    def bad_auth(batch, _log=log):
        with open(_log, "a") as f:
            f.write("attempt\n")
        raise EncoderAuthError("invalid api key")

    udf = make_embed_udf(bad_auth, retry_sleep=0.0)
    with pytest.raises(Exception, match="invalid api key"):
        _one_row(spark).select(udf(F.col("text")).alias("v")).collect()
    with open(log) as f:
        assert len(f.readlines()) == 1  # NO retry on auth failure


def test_transient_exhaustion_raises(spark, tmp_path):
    log = str(tmp_path / "exhaust.log")

    def always_down(batch, _log=log):
        with open(_log, "a") as f:
            f.write("attempt\n")
        raise RuntimeError("still down")

    udf = make_embed_udf(always_down, retry_sleep=0.0)
    with pytest.raises(Exception, match="still down"):
        _one_row(spark).select(udf(F.col("text")).alias("v")).collect()
    with open(log) as f:
        assert len(f.readlines()) == 3  # exactly max_attempts
