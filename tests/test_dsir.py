"""DSIR importance-weight tests (textstats.dsir_importance_weights) — python
recomputation golden + the selection property the op exists for; the driver
gate (`dsir_importance_weights`) hash-checks the full dataflow vs DuckDB."""

import hashlib
import math

from aiwhispr_spark.operators.textstats import dsir_importance_weights

B = 4096


def _bucket(tok: str) -> int:
    return int(hashlib.md5(tok.encode()).hexdigest()[:8], 16) % B


def _expected(raw, target):
    """raw/target: dict id -> text.  Mirrors the documented math exactly."""
    rtoks = {i: [t for t in s.lower().split() if t] for i, s in raw.items()}
    ttoks = [t for s in target.values() for t in s.lower().split() if t]
    cnt_r, cnt_t = {}, {}
    for ts in rtoks.values():
        for t in ts:
            cnt_r[_bucket(t)] = cnt_r.get(_bucket(t), 0) + 1
    for t in ttoks:
        cnt_t[_bucket(t)] = cnt_t.get(_bucket(t), 0) + 1
    total_r, total_t = sum(cnt_r.values()), sum(cnt_t.values())
    lr_i = {}
    for b in set(cnt_r) | set(cnt_t):
        lr = (
            math.log(cnt_t.get(b, 0) + 1.0)
            - math.log(total_t + float(B))
            - math.log(cnt_r.get(b, 0) + 1.0)
            + math.log(total_r + float(B))
        )
        lr_i[b] = int(round(1e6 * lr))
    return {
        i: (len(ts), sum(lr_i[_bucket(t)] for t in ts))
        for i, ts in rtoks.items()
        if ts
    }


def _run(spark, raw, target):
    rdf = spark.createDataFrame(
        [(i, s) for i, s in raw.items()], "doc_id long, text string"
    )
    tdf = spark.createDataFrame(
        [(i, s) for i, s in target.items()], "doc_id long, text string"
    )
    return {
        r["doc_id"]: (r["n_tokens"], r["weight_i"])
        for r in dsir_importance_weights(rdf, tdf).collect()
    }


def test_matches_python_reference(spark):
    raw = {
        1: "alpha beta gamma",
        2: "delta delta epsilon",
        3: "alpha zeta",
        4: "",
    }
    target = {10: "alpha alpha beta", 11: "alpha gamma"}
    got = _run(spark, raw, target)
    assert got == _expected(raw, target)


def test_target_like_doc_outweighs_raw_only_doc(spark):
    # doc 1 uses only target vocabulary, doc 2 only raw-side junk tokens
    raw = {
        1: "quality prose sentence",
        2: "zzjunk1 zzjunk2 zzjunk3",
        3: "quality prose zzjunk1",
    }
    target = {10: "quality prose sentence quality prose"}
    got = _run(spark, raw, target)
    assert got[1][1] > got[3][1] > got[2][1]


def test_empty_doc_excluded(spark):
    got = _run(spark, {1: "a b", 2: "   "}, {10: "a"})
    assert 2 not in got and 1 in got
