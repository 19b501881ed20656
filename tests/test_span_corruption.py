"""T5 span corruption (packing.py::span_corruption) — the LOSSLESS invariant:
splicing each target span back over its input sentinel reconstructs the
original token stream exactly, for every doc."""

import re


def _reconstruct(input_text: str, target_text: str) -> str:
    spans: dict[str, list[str]] = {}
    cur = None
    for tok in target_text.split():
        m = re.fullmatch(r"<extra_id_(\d+)>", tok)
        if m:
            cur = tok
            spans[cur] = []
        else:
            spans[cur].append(tok)
    out = []
    for tok in input_text.split():
        if re.fullmatch(r"<extra_id_\d+>", tok):
            out.extend(spans[tok])
        else:
            out.append(tok)
    return " ".join(out)


def test_span_corruption_is_lossless_and_deterministic(spark):
    from aiwhispr_spark.operators.packing import span_corruption

    rows = [
        (i, f"alpha{i} beta gamma delta epsilon zeta eta theta iota kappa " * 5)
        for i in range(40)
    ]
    rows.append((100, ""))  # empty doc
    rows.append((101, "single"))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in span_corruption(docs, noise_pct=30).collect()}

    total_masked = 0
    for i in range(40):
        r = out[i]
        original = " ".join(rows[i][1].split())
        assert _reconstruct(r.input_text, r.target_text) == original
        total_masked += r.n_masked
        # sentinels appear in order and pair up across input/target
        in_s = re.findall(r"<extra_id_\d+>", r.input_text)
        tg_s = re.findall(r"<extra_id_\d+>", r.target_text)
        assert in_s == tg_s == [f"<extra_id_{k}>" for k in range(len(in_s))]
    # ~30% of 40*50 tokens masked; md5 coin is content-seeded, not RNG
    assert 400 < total_masked < 800
    assert out[100].input_text == "" and out[100].n_masked == 0
    assert out[101].n_masked in (0, 1)

    # determinism: a rerun produces the identical corruption
    again = {r.doc_id: r for r in span_corruption(docs, noise_pct=30).collect()}
    assert all(
        (again[k].input_text, again[k].target_text) == (out[k].input_text, out[k].target_text)
        for k in out
    )


def test_null_text_behaves_like_empty(spark):
    # NULL text must not propagate NULL through the fold (the oracle's
    # unnest+coalesce path yields ''/''/0 — the engine must match)
    from aiwhispr_spark.operators.packing import span_corruption

    docs = spark.createDataFrame([(1, None), (2, "a b")], "doc_id long, text string")
    got = {r.doc_id: r for r in span_corruption(docs).collect()}
    assert (got[1].input_text, got[1].target_text, got[1].n_masked) == ("", "", 0)
    assert got[2].n_masked is not None
