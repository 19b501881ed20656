"""Graph-navigable ANN (build_knn_graph + knn_graph_beam_search) — the
NSW/DiskANN-style analog of the reference's HNSW indexes
(qdrantVectorDb.py:270-273, postgresVectorDb.py:67-68)."""

import pytest
from pyspark.sql import functions as F

from aiwhispr_spark.functions.udfs import cosine_expr
from aiwhispr_spark.operators.similarity import build_knn_graph, knn_graph_beam_search

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet")


def test_graph_shape_and_self_exclusion(emb):
    # deterministic subset (limit without orderBy is partition-order
    # dependent — ADVICE r4), same discipline as the sibling test
    adj = build_knn_graph(emb.filter(F.col("vec_id") < 50), m=4)
    rows = adj.collect()
    assert all(r["src"] != r["dst"] for r in rows)
    per_src = {}
    for r in rows:
        per_src[r["src"]] = per_src.get(r["src"], 0) + 1
    assert set(per_src.values()) == {4}
    # carried vector must be the dst's actual embedding
    one = rows[0]
    real = emb.filter(F.col("vec_id") == one["dst"]).first()["embedding"]
    assert [round(float(x), 5) for x in one["dst_vec"]] == [
        round(float(x), 5) for x in real
    ]


def test_graph_edges_are_true_nearest(emb):
    # spot-check one src: its m=3 edges must be the exact top-3 by cosine
    sub = emb.filter(F.col("vec_id") < 40)
    adj = build_knn_graph(sub, m=3)
    src0 = adj.filter(F.col("src") == 0).orderBy(F.desc("sim_i"), "dst").collect()
    qvec = [float(x) for x in sub.filter(F.col("vec_id") == 0).first()["embedding"]]
    exact = (
        sub.filter(F.col("vec_id") != 0)
        .select(
            "vec_id",
            F.round(cosine_expr("embedding", qvec) * 10000).cast("long").alias("s"),
        )
        .orderBy(F.desc("s"), "vec_id")
        .limit(3)
        .collect()
    )
    assert [r["dst"] for r in src0] == [r["vec_id"] for r in exact]


def test_beam_search_recall_at_10(emb):
    # the VERDICT r3 #5 contract: recall@10 >= 0.95 vs the exact operator at
    # the registered operating point (m=8, ef=32, 4 rounds, 8 entries); on
    # the gate fixtures measured recall is 1.0 — the driver gate
    # (knn_graph_search found_i) pins exactly that.
    qvec = [float(x) for x in emb.filter(F.col("vec_id") == 0).first()["embedding"]]
    adj = build_knn_graph(emb, m=8).localCheckpoint()
    beam = knn_graph_beam_search(adj, emb, qvec, k=10, ef=32, rounds=4, n_entries=8)
    got = {r["nid"] for r in beam.collect()}
    exact = (
        emb.select(
            "vec_id",
            F.round(cosine_expr("embedding", qvec) * 10000).cast("long").alias("s"),
        )
        .orderBy(F.desc("s"), "vec_id")
        .limit(10)
        .collect()
    )
    top = {r["vec_id"] for r in exact}
    assert len(got & top) >= 10 * 0.95
    # and the beam's scores are the exact scores (no approximation in the
    # scoring path, only in coverage)
    beam_scores = {r["nid"]: r["score_i"] for r in beam.collect()}
    for r in exact:
        if r["vec_id"] in beam_scores:
            assert beam_scores[r["vec_id"]] == r["s"]


def test_lsh_tier_activates_past_cap(emb):
    """VERDICT r4 #4: past max_build_rows the build falls back to the
    sign-LSH + NN-Descent tier instead of raising — distributed, no
    driver-side collect.  Shape contract: ≤ m edges per src, no self
    edges, carried dst_vec is real; edge recall vs the exact build ≥ 0.85
    on the quasi-random hash-embedder fixture (measured 0.944 — the
    adversarial geometry for sign-LSH; the margin discipline)."""
    exact = build_knn_graph(emb, m=8)
    approx = build_knn_graph(emb, m=8, max_build_rows=10)  # forces the tier
    rows = approx.collect()
    assert all(r["src"] != r["dst"] for r in rows)
    per_src = {}
    for r in rows:
        per_src[r["src"]] = per_src.get(r["src"], 0) + 1
    assert max(per_src.values()) <= 8
    assert len(per_src) == emb.count()  # every node got edges
    ex = {(r["src"], r["dst"]) for r in exact.collect()}
    ap = {(r["src"], r["dst"]) for r in rows}
    assert len(ex & ap) / len(ex) >= 0.85
    # carried vector must be the dst's actual embedding (same contract as
    # the exact tier)
    one = rows[0]
    real = emb.filter(F.col("vec_id") == one["dst"]).first()["embedding"]
    assert [round(float(x), 4) for x in one["dst_vec"]] == [
        round(float(x), 4) for x in real
    ]


def _synthetic_vectors(spark, n, dim=32):
    """Deterministic quasi-random unit-cube vectors, generated JVM-side
    (no driver materialization) — the geometry class of the gate fixtures."""
    vec = F.transform(
        F.sequence(F.lit(0), F.lit(dim - 1)),
        lambda j: (
            F.pmod(F.xxhash64(F.col("id"), j), F.lit(10000)).cast("double")
            / 10000.0
            - 0.5
        ),
    )
    return spark.range(n).select(
        F.col("id").alias("vec_id"), vec.cast("array<float>").alias("embedding")
    )


def _beam_recall_at_10(emb, adj, query_ids, ef=64, rounds=6, n_entries=32):
    hits = 0
    for qid in query_ids:
        qvec = [
            float(x)
            for x in emb.filter(F.col("vec_id") == qid).first()["embedding"]
        ]
        beam = knn_graph_beam_search(
            adj, emb, qvec, k=10, ef=ef, rounds=rounds, n_entries=n_entries
        )
        got = {r["nid"] for r in beam.collect()}
        want = {
            r["vec_id"]
            for r in emb.select(
                "vec_id",
                F.round(cosine_expr("embedding", qvec) * 10000)
                .cast("long")
                .alias("s"),
            )
            .orderBy(F.desc("s"), "vec_id")
            .limit(10)
            .collect()
        }
        hits += len(got & want)
    return hits / (10 * len(query_ids))


def test_lsh_tier_beam_recall_midsize(spark):
    """The scale-path value gate: beam search over an LSH-tier-built graph
    (m=16, matching the reference's HNSW M=16 — postgresVectorDb.py:67-68)
    on 4000 synthetic vectors, recall@10 ≥ 0.95 vs exact
    (measured 1.0 at n=6000; n=4000 keeps the always-on suite fast, the
    120k run below is the >max_build_rows evidence)."""
    emb = _synthetic_vectors(spark, 4000).persist()
    emb.count()
    adj = build_knn_graph(emb, m=16, max_build_rows=1000).localCheckpoint()
    recall = _beam_recall_at_10(emb, adj, [0, 7, 123, 2222, 3999])
    emb.unpersist()
    assert recall >= 0.95, recall


@pytest.mark.skipif(
    not __import__("os").environ.get("SPARK_GRAFT_STRESS"),
    reason="full-size LSH-tier stress is opt-in (SPARK_GRAFT_STRESS=1)",
)
def test_lsh_tier_beam_recall_120k(spark):
    """VERDICT r4 #4 'Done' criterion: knn_graph_search works UNCHANGED on
    a tier larger than max_build_rows (120k > 100k default cap — the tier
    activates naturally, nothing collected to the driver), recall@10 ≥
    0.95 value-gated.  Beam point ef=128/10 rounds/64 entries — search-time
    beam width is the standard graph-ANN recall dial (HNSW ef_search; the
    reference runs ef=128 too, qdrantVectorDb.py:270-273): measured 0.98
    here vs 0.96 at ef=96 and 0.86 at the small-fixture point ef=64."""
    emb = _synthetic_vectors(spark, 120_000).persist()
    emb.count()
    adj = build_knn_graph(emb, m=16).localCheckpoint()  # default cap: tier on
    recall = _beam_recall_at_10(
        emb, adj, [0, 31337, 77777, 119999, 55555], ef=128, rounds=10,
        n_entries=64,
    )
    emb.unpersist()
    assert recall >= 0.95, recall


def test_incremental_insert_equals_rebuild(emb):
    # the incremental ≡ batch contract: inserting an interleaved delta into
    # an existing graph must land EXACTLY on the from-scratch rebuild of
    # the union — same numpy kernel on both paths, so even rounded-sim
    # boundary cases agree (a JVM-fold refresh could differ by one ulp)
    from aiwhispr_spark.operators.similarity import insert_into_knn_graph

    existing = emb.filter(F.col("vec_id") % 4 != 0)
    delta = emb.filter(F.col("vec_id") % 4 == 0)
    adj = build_knn_graph(existing, m=5)
    inc = insert_into_knn_graph(adj, existing, delta, m=5)
    full = build_knn_graph(emb, m=5)
    a = {(r["src"], r["dst"], r["sim_i"]) for r in inc.collect()}
    b = {(r["src"], r["dst"], r["sim_i"]) for r in full.collect()}
    assert a == b
    # every delta src present with exactly m edges
    per_src = {}
    for s, _, _ in a:
        per_src[s] = per_src.get(s, 0) + 1
    for r in delta.select("vec_id").collect():
        assert per_src.get(r["vec_id"]) == 5


def test_delete_repair_equals_rebuild(emb):
    # delete half of the lifecycle: tombstone + eager repair of degraded
    # sources must land exactly on the from-scratch rebuild of the
    # remaining set; untouched sources keep their rows byte-identical
    from aiwhispr_spark.operators.similarity import remove_from_knn_graph

    removed = emb.filter(F.col("vec_id") % 6 == 0).select("vec_id")
    remaining = emb.filter(F.col("vec_id") % 6 != 0)
    adj = build_knn_graph(emb, m=5)
    rep = remove_from_knn_graph(adj, remaining, removed, m=5)
    full = build_knn_graph(remaining, m=5)
    a = {(r["src"], r["dst"], r["sim_i"]) for r in rep.collect()}
    b = {(r["src"], r["dst"], r["sim_i"]) for r in full.collect()}
    assert a == b
    # no removed id survives as src or dst
    gone = {r["vec_id"] for r in removed.collect()}
    assert not any(s in gone or d in gone for s, d, _ in a)


def test_maintenance_edge_cases(emb):
    # review-pass r4: empty delta is a first-class no-op; total delete
    # yields an empty adjacency (not a numpy AxisError); overlapping delta
    # ids are refused (silent index corruption otherwise)
    from aiwhispr_spark.operators.similarity import (
        insert_into_knn_graph,
        remove_from_knn_graph,
    )

    sub = emb.filter(F.col("vec_id") < 40)
    adj = build_knn_graph(sub, m=3)
    n = adj.count()
    empty = sub.filter(F.lit(False))
    assert insert_into_knn_graph(adj, sub, empty, m=3).count() == n
    wiped = remove_from_knn_graph(adj, empty, sub.select("vec_id"), m=3)
    assert wiped.count() == 0
    with pytest.raises(ValueError, match="upsert"):
        insert_into_knn_graph(adj, sub, sub.limit(3), m=3)
