"""Large-corpus structural invariants (VERDICT r2 #7).

The full-size run is env-gated (it owns the whole machine for ~15 min):

    SPARK_GRAFT_STRESS=1000000 python -m pytest tests/test_stress_invariants.py -x -q

Default suite runs a 20k-doc variant of the SAME invariants (over-merge /
under-merge detection via the corpus's 3-surfaces-per-entity construction)
so the assertion path itself is always exercised.  The r2 lesson motivating
this file: a blocking-recall fix exposed an over-merge that only a 100k run
caught — alias-family regressions hide below scale.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run_stress(n_docs: int, workdir: str) -> dict:
    # fresh interpreter/JVM: one SparkContext per measurement (restarting a
    # context in-process corrupts PythonAccumulatorV2 — memory dir)
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "stress_pipeline.py"), str(n_docs), workdir],
        capture_output=True,
        text=True,
        timeout=3600,
        cwd=REPO,
    )
    assert proc.returncode == 0, proc.stdout[-2000:] + proc.stderr[-2000:]
    with open(os.path.join(workdir, "report.json")) as f:
        return json.load(f)


def _check_invariants(report: dict, n_docs: int) -> None:
    assert report["n_docs"] == n_docs
    assert report["n_triples"] > n_docs  # several triples per doc on average
    fams = report["biggest_families"]
    # the corpus plants each entity as exactly 3 surface forms: any larger
    # family is an over-merge (the r2 entity14∪entity140 class of bug)
    assert fams and fams[0]["n_aliases"] <= 3, f"over-merge: {fams[0]}"
    # under-merge: ~160/200 planted entities survive extraction (measured at
    # 20k AND 1M); zero merging yields ~3× that, so the bound sits near the
    # planted count — 3×200 would be vacuously satisfied by a total blocking
    # failure
    assert report["n_entities"] <= 1.25 * 200, f"under-merge: {report['n_entities']} families"


def test_stress_invariants_small(tmp_path):
    report = _run_stress(20_000, str(tmp_path / "stress"))
    _check_invariants(report, 20_000)


@pytest.mark.skipif(
    not os.environ.get("SPARK_GRAFT_STRESS"),
    reason="full-size stress is opt-in: SPARK_GRAFT_STRESS=<n_docs>",
)
def test_stress_invariants_full():
    n = int(os.environ["SPARK_GRAFT_STRESS"])
    report = _run_stress(n, "/tmp/kg_stress_pytest")
    _check_invariants(report, n)
