"""ORC source/sink tests (sources/orcsrc.py): roundtrip fidelity (unicode,
embedded quotes/newlines, NULLs, negative ids), splittable dir-of-files
layout, and pushdown/pruning reaching the ORC scan."""

from __future__ import annotations

import glob
import os

from pyspark.sql import functions as F

from aiwhispr_spark.sources.orcsrc import (
    fixture_frame,
    read_orc,
    write_orc,
    write_orc_fixture,
)


def test_roundtrip_values_exact(spark, tmp_path):
    path = str(tmp_path / "orc_corpus")
    write_orc(fixture_frame(spark, 40), path)
    got = {r.doc_id: r for r in read_orc(spark, path).collect()}
    exp = {r.doc_id: r for r in fixture_frame(spark, 40).collect()}
    assert set(got) == set(exp) and len(got) == 40
    for k in exp:
        assert (got[k].lang, got[k].text, got[k].score) == (
            exp[k].lang,
            exp[k].text,
            exp[k].score,
        )
    # the fixture actually exercises the hard cases
    texts = [r.text for r in exp.values()]
    assert any('"' in t for t in texts)
    assert all("\n" in t for t in texts)
    assert any("中" in t for t in texts)
    assert any(r.lang is None for r in exp.values())
    assert min(exp) < 0


def test_dir_of_files_layout_and_idempotent_fixture(spark, tmp_path):
    path = str(tmp_path / "orc_fix")
    write_orc_fixture(spark, path, n_docs=64)
    files = glob.glob(os.path.join(path, "*.orc"))
    # splittable layout: many files, not one giant single-stripe file
    assert len(files) >= 4
    mtimes = {f: os.path.getmtime(f) for f in files}
    write_orc_fixture(spark, path, n_docs=64)
    assert {f: os.path.getmtime(f) for f in files} == mtimes


def test_orc_scan_pushes_filters_and_prunes_columns(spark, tmp_path):
    path = str(tmp_path / "orc_scan")
    write_orc(fixture_frame(spark, 64), path)
    df = read_orc(spark, path).where(F.col("doc_id") > 10).select("doc_id", "lang")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [IsNotNull(doc_id), GreaterThan(doc_id,10)]" in plan
    # column pruning: text/score never leave the scan
    assert "text" not in plan.split("ReadSchema")[1][:200]
