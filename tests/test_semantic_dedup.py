"""Semantic (SemDeDup-style) dedup gates (operators/similarity.py::
semantic_dedup_pairs).  The sf-scale value gate vs the DuckDB twin is
`semantic_dedup_pairs` in __spark_entry__.py; these pin assignment,
tie-breaking, and the intra-cluster-only property on hand-built vectors."""

from pyspark.sql import functions as F

from aiwhispr_spark.operators.similarity import semantic_dedup_pairs


def _emb(spark, rows):
    return spark.createDataFrame(rows, "vec_id int, embedding array<double>")


def test_pairs_only_within_cluster(spark):
    # two orthogonal directions; 10/11 near +x, 20/21 near +y
    e = _emb(
        spark,
        [
            (0, [1.0, 0.0]),
            (1, [0.0, 1.0]),
            (10, [0.9, 0.1]),
            (11, [0.95, 0.05]),
            (20, [0.1, 0.9]),
            (21, [0.05, 0.95]),
        ],
    )
    cents = e.filter(F.col("vec_id") < 2)
    out = semantic_dedup_pairs(e, cents, threshold_i=9000).collect()
    pairs = {(r.va, r.vb): r.cid for r in out}
    assert (10, 20) not in pairs and (11, 21) not in pairs  # cross-cluster never
    assert pairs[(0, 10)] == 0 and pairs[(0, 11)] == 0 and pairs[(10, 11)] == 0
    assert pairs[(1, 20)] == 1 and pairs[(20, 21)] == 1


def test_tie_breaks_to_lowest_centroid_id(spark):
    # vector equidistant from two identical centroids → cluster 0
    e = _emb(spark, [(0, [1.0, 0.0]), (1, [1.0, 0.0]), (5, [1.0, 0.0])])
    cents = e.filter(F.col("vec_id") < 2)
    out = semantic_dedup_pairs(e, cents, threshold_i=0).collect()
    assert {r.cid for r in out} == {0}
    assert {(r.va, r.vb) for r in out} == {(0, 1), (0, 5), (1, 5)}


def test_threshold_filters(spark):
    e = _emb(spark, [(0, [1.0, 0.0]), (1, [0.9, 0.1]), (2, [0.6, 0.4])])
    cents = e.filter(F.col("vec_id") == 0)
    hi = semantic_dedup_pairs(e, cents, threshold_i=9990).collect()
    lo = semantic_dedup_pairs(e, cents, threshold_i=0).collect()
    assert len(hi) < len(lo) and len(lo) == 3


def test_zero_vector_safe(spark):
    e = _emb(spark, [(0, [1.0, 0.0]), (1, [0.0, 0.0])])
    cents = e.filter(F.col("vec_id") == 0)
    out = semantic_dedup_pairs(e, cents, threshold_i=0).collect()
    # zero vector has cos 0 with everything; still assigned (to cid 0) and paired at τ=0
    assert {(r.va, r.vb) for r in out} == {(0, 1)}
