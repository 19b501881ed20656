"""Distributed run vs single-process oracle: the BASELINE.json gates.

* extracted text per url — byte-identical (gate: exact)
* chunk rows — byte-identical per (url, chunk_no)
* triples — P/R ≥ 0.95 keyed on (url, subj, pred, obj) (exact in practice)
* canonicalization — alias families merge to one entity id
"""

from __future__ import annotations

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from aiwhispr_spark.oracle.pipeline import run_oracle
from aiwhispr_spark.plans.kg_pipeline import build_knowledge_graph, docs_to_chunks, extract_text


@pytest.fixture(scope="module")
def oracle_result(corpus_path):
    table = pq.read_table(corpus_path)
    docs = [{"url": u, "html": h} for u, h in zip(table["url"].to_pylist(), table["html"].to_pylist())]
    return run_oracle(docs)


@pytest.fixture(scope="module")
def docs_df(spark, corpus_path):
    return spark.read.parquet(corpus_path)


def test_e1_extract_byte_identity(spark, docs_df, oracle_result):
    rows = extract_text(docs_df).select("url", "text").collect()
    assert len(rows) == len(oracle_result["texts"])
    for r in rows:
        assert r["text"] == oracle_result["texts"][r["url"]], r["url"]


def test_e2_chunks_byte_identity(spark, docs_df, oracle_result):
    got = {
        (r["url"], r["chunk_no"]): r["text_chunk"]
        for r in docs_to_chunks(docs_df).collect()
    }
    want = {(c["url"], c["chunk_no"]): c["text_chunk"] for c in oracle_result["chunks"]}
    assert set(got) == set(want)
    for key in want:
        assert got[key] == want[key], key


@pytest.fixture(scope="module")
def kg_result(spark, docs_df):
    return build_knowledge_graph(spark, docs_df)


def test_e3_triples_precision_recall(spark, kg_result, oracle_result):
    got = {
        (r["url"], r["subj"], r["pred"], r["obj"])
        for r in kg_result["triples"].collect()
    }
    want = {(t["url"], t["subj"], t["pred"], t["obj"]) for t in oracle_result["triples"]}
    assert want, "oracle produced no triples — corpus generator broken"
    tp = len(got & want)
    precision = tp / len(got) if got else 0.0
    recall = tp / len(want)
    assert precision >= 0.95 and recall >= 0.95, (precision, recall)


def test_e5_external_candidate_linking_agreement(spark, oracle_result):
    """Distributed linker vs oracle linker on an EXTERNAL candidate table
    (canonical corp forms + places/people + pure distractors) — the mention
    stream and candidate set are disjoint constructions, so agreement here
    means the cosine argmax is real, not the self-link tautology."""
    from aiwhispr_spark.embedding import hash_embed
    from aiwhispr_spark.operators.linking import link_mentions
    from aiwhispr_spark.oracle.pipeline import oracle_link

    mentions = sorted(
        {t["subj"] for t in oracle_result["triples"]}
        | {t["obj"] for t in oracle_result["triples"]}
    )
    assert mentions, "oracle produced no mentions"
    candidates = (
        [f"E{n} Corp" for n in range(1, 121)]
        + ["Berlin", "Paris", "Tokyo", "Oslo", "Madrid", "Lagos", "Lima", "Delhi"]
        + ["Ada Byron", "Alan Turing", "Grace Hopper", "Edsger Dijkstra"]
        + ["Unrelated Distractor", "Phantom Holdings", "Null Island"]
    )
    want = oracle_link(mentions, candidates)

    m_df = spark.createDataFrame([(m,) for m in mentions], "mention string")
    c_df = spark.createDataFrame(
        [(c, hash_embed(c)) for c in candidates], "entity string, embedding array<float>"
    )
    got = {r["mention"]: r["entity"] for r in link_mentions(m_df, c_df).collect()}

    assert set(got) == set(want)
    agree = sum(got[m] == want[m] for m in mentions) / len(mentions)
    # float-summation-order near-ties may flip an argmax; anything beyond
    # that is a real linker divergence
    assert agree >= 0.98, [
        (m, got[m], want[m]) for m in mentions if got[m] != want[m]
    ][:10]


def test_e6_alias_families_merge(spark, kg_result):
    alias_map = {r["alias"]: r["entity_id"] for r in kg_result["alias_map"].collect()}
    # the three surface forms of a rank present in the corpus must share an id
    families = {}
    for alias, eid in alias_map.items():
        import re

        m = re.match(r"^(?:Entity[_ ]|E)(\d+)(?: Corp)?$", alias)
        if m:
            families.setdefault(m.group(1), set()).add(eid)
    multi = [k for k, v in families.items() if len(v) > 1]
    assert families, "no entity aliases found"
    assert not multi, f"unmerged alias families: {multi[:5]}"


def test_e7_writes_and_resume(spark, docs_df, tmp_path):
    out = str(tmp_path / "kg")
    small = docs_df.limit(40)
    res1 = build_knowledge_graph(spark, small, output_dir=out, run_id="r1")
    triples1 = spark.read.parquet(out + "/triples")
    n1 = triples1.count()
    assert n1 > 0
    manifest = spark.read.parquet(res1["manifest_path"])
    assert manifest.select("url").distinct().count() == small.count()

    # partial manifest → only the missing urls flow (and the full manifest,
    # being a superset, would yield the empty complement by the same anti-join)
    half = manifest.filter(F.crc32(F.col("url")) % 2 == 0)
    res3 = build_knowledge_graph(spark, small, manifest=half, run_id="r3")
    remaining_urls = {r["url"] for r in res3["chunks"].select("url").distinct().collect()}
    done_urls = {r["url"] for r in half.select("url").collect()}
    assert not (remaining_urls & done_urls)
    assert remaining_urls  # the other half did flow

    # resume INTO the same output dir: prior triples must SURVIVE (append,
    # not overwrite) — a complete manifest yields a 0-row delta and the
    # materialized tables must be unchanged, not clobbered
    full_manifest = spark.read.parquet(res1["manifest_path"])
    res4 = build_knowledge_graph(
        spark, small, output_dir=out, manifest=full_manifest, run_id="r4"
    )
    assert res4["metrics"]["docs"].value == 0
    assert spark.read.parquet(out + "/triples").count() == n1
    assert spark.read.parquet(out + "/entities").count() > 0
    assert spark.read.parquet(out + "/aliases").count() > 0

    # incremental resume: half-manifest delta appends ONLY the missing urls'
    # triples; union of both runs equals a from-scratch full run
    out2 = str(tmp_path / "kg2")
    build_knowledge_graph(spark, small, output_dir=out2, manifest=half, run_id="r5")
    first = spark.read.parquet(out2 + "/triples")
    assert {r["url"] for r in first.select("url").distinct().collect()} <= remaining_urls
    build_knowledge_graph(
        spark,
        small,
        output_dir=out2,
        manifest=spark.read.parquet(out2 + "/manifest"),
        run_id="r6",
    )
    merged = spark.read.parquet(out2 + "/triples")
    want = {
        (r["url"], r["subj"], r["pred"], r["obj"])
        for r in triples1.select("url", "subj", "pred", "obj").collect()
    }
    got = {
        (r["url"], r["subj"], r["pred"], r["obj"])
        for r in merged.select("url", "subj", "pred", "obj").collect()
    }
    assert got == want
    # run_id lineage: every triple row is tagged with the run that wrote it
    assert set(r["run_id"] for r in merged.select("run_id").distinct().collect()) == {"r5", "r6"}

    # compaction: refreshes every row's ids against the merged alias map,
    # preserving the row multiset
    from aiwhispr_spark.plans.kg_pipeline import recanonicalize_output

    n_merged = merged.count()
    recanonicalize_output(spark, out2)
    refreshed = spark.read.parquet(out2 + "/triples")
    assert refreshed.count() == n_merged
    amap = {r["alias"]: r["entity_id"] for r in spark.read.parquet(out2 + "/aliases").collect()}
    for r in refreshed.select("subj", "subj_id").distinct().collect():
        assert r["subj_id"] == amap.get(r["subj"], r["subj"])


def test_resume_incremental_alias_strategy(spark, tmp_path):
    """alias_strategy='incremental': the resume run assigns ONLY the delta
    surfaces against the stored alias table and appends — old assignments
    are byte-unchanged, every surface is assigned exactly once, delta
    surfaces of known families adopt the stored entity id, and the family
    partition structure matches the reelect twin (no cross-run bridges in
    this corpus)."""
    from aiwhispr_spark.sources.synthetic import write_simple_corpus_parquet

    p = str(tmp_path / "docs.parquet")
    write_simple_corpus_parquet(p, n_docs=60, n_entities=20)
    docs = spark.read.parquet(p)
    idx = F.regexp_extract(F.col("url"), r"p/(\d+)$", 1).cast("long")
    first, full = docs.filter(idx < 30), docs

    out = str(tmp_path / "kg_inc")
    r1 = build_knowledge_graph(spark, first, output_dir=out, run_id="r1")
    aliases1 = {
        (r["alias"], r["entity_id"])
        for r in spark.read.parquet(out + "/aliases").collect()
    }
    manifest = spark.read.parquet(r1["manifest_path"])
    build_knowledge_graph(
        spark, full, output_dir=out, manifest=manifest, run_id="r2",
        alias_strategy="incremental",
    )
    aliases2 = {
        (r["alias"], r["entity_id"])
        for r in spark.read.parquet(out + "/aliases").collect()
    }
    # append-only: old rows survive untouched; one assignment per surface
    assert aliases1 <= aliases2
    surfaces = [a for a, _ in aliases2]
    assert len(set(surfaces)) == len(surfaces)
    # delta surfaces that extend stored families adopt the STORED ids
    stored_ids = {e for _, e in aliases1}
    adopted = {e for (a, e) in aliases2 - aliases1 if e in stored_ids}
    assert adopted, "entities recur across runs, so adoptions must happen"
    # entities table is exactly the rollup of the aliases table
    ent_pairs = {
        (a, r["entity_id"])
        for r in spark.read.parquet(out + "/entities").collect()
        for a in r["aliases"]
    }
    assert ent_pairs == aliases2

    # partition-structure equivalence with the reelect twin
    out2 = str(tmp_path / "kg_re")
    r1b = build_knowledge_graph(spark, first, output_dir=out2, run_id="r1")
    build_knowledge_graph(
        spark, full, output_dir=out2,
        manifest=spark.read.parquet(r1b["manifest_path"]), run_id="r2",
    )
    def parts(path):
        by_ent = {}
        for r in spark.read.parquet(path).collect():
            by_ent.setdefault(r["entity_id"], set()).add(r["alias"])
        return {frozenset(v) for v in by_ent.values()}

    assert parts(out + "/aliases") == parts(out2 + "/aliases")
