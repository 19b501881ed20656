"""Unit tests for integer-exact Lloyd k-means (operators/clustering.py),
N-Triples export (operators/rdf.py) and KG negative sampling
(operators/kgscore.py::negative_samples).  The driver gates
(`kmeans_domain_clusters`, `ntriples_export`, `kg_negative_samples`)
hash-check all three against DuckDB twins at sf0.01."""

from pyspark.sql import functions as F

from aiwhispr_spark.operators.clustering import kmeans_lloyd
from aiwhispr_spark.operators.rdf import ntriples_lines


def _vecs(spark, rows, dim=4):
    return spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in rows],
        f"vec_id long, embedding array<float>",
    )


class TestKmeans:
    def test_two_blobs_separate(self, spark):
        rows = [(0, [0, 0, 0, 0]), (1, [0.01, 0, 0, 0]), (2, [0, 0.01, 0, 0]),
                (3, [5, 5, 5, 5]), (4, [5.01, 5, 5, 5]), (5, [5, 5.01, 5, 5])]
        out = kmeans_lloyd(_vecs(spark, rows), k=2, iterations=2, dim=4)
        got = {r["id"]: r["cid"] for r in out.collect()}
        assert got[0] == got[1] == got[2]
        assert got[3] == got[4] == got[5]
        assert got[0] != got[3]

    def test_deterministic_across_runs(self, spark):
        rows = [(i, [((i * 7 + d) % 13) / 13.0 for d in range(4)]) for i in range(40)]
        a = sorted(map(tuple, kmeans_lloyd(_vecs(spark, rows), k=3, iterations=2, dim=4).collect()))
        b = sorted(map(tuple, kmeans_lloyd(_vecs(spark, rows), k=3, iterations=2, dim=4).collect()))
        assert a == b

    def test_empty_cluster_keeps_centroid(self, spark):
        # ids 0,1 seed two centroids at the same point -> after assignment
        # (ties break to cid 0) cluster 1 is empty and must keep its seed,
        # not crash or emit NULLs
        rows = [(0, [0, 0, 0, 0]), (1, [0, 0, 0, 0]), (2, [9, 9, 9, 9])]
        out = kmeans_lloyd(_vecs(spark, rows), k=2, iterations=2, dim=4).collect()
        assert len(out) == 3
        assert all(r["cid"] is not None and r["dist_l"] is not None for r in out)

    def test_distance_is_exact_integer(self, spark):
        rows = [(0, [0, 0, 0, 0]), (1, [0.002, 0, 0, 0])]
        out = {r["id"]: r for r in kmeans_lloyd(
            _vecs(spark, rows), k=1, iterations=0, dim=4).collect()}
        # quantized grid: 0.002*1000 = 2 -> dist to the id-0 seed = 4
        assert out[1]["dist_l"] == 4
        assert out[0]["dist_l"] == 0


class TestNTriples:
    def test_escaping_and_iri_encoding(self, spark):
        df = spark.createDataFrame(
            [("E One", "based in", 'a\\b "c"\nd\te\rf')],
            "subj string, pred string, obj string",
        )
        line = ntriples_lines(df).first()["line"]
        assert line == (
            '<urn:kg:e:E%20One> <urn:kg:p:based%20in> '
            '"a\\\\b \\"c\\"\\nd\\te\\rf" .'
        )

    def test_plain_ascii_untouched(self, spark):
        df = spark.createDataFrame(
            [("A", "acquired", "B Corp")], "subj string, pred string, obj string"
        )
        assert ntriples_lines(df).first()["line"] == '<urn:kg:e:A> <urn:kg:p:acquired> "B Corp" .'


class TestNegativeSamples:
    def _triples(self, spark):
        rows = [(f"E{i % 5}", "acquired", f"E{(i + 1) % 5}") for i in range(10)]
        rows += [(f"E{i % 5}", "based in", "Berlin") for i in range(5)]
        return spark.createDataFrame(rows, "subj string, pred string, obj string")

    def test_no_accidental_positives_and_no_noops(self, spark):
        from aiwhispr_spark.operators.kgscore import negative_samples

        t = self._triples(spark)
        negs = negative_samples(t, per_triple=2)
        rows = negs.collect()
        assert rows
        true = {(r["subj"], r["pred"], r["obj"]) for r in t.distinct().collect()}
        for r in rows:
            assert (r["subj"], r["pred"], r["neg_obj"]) not in true
            assert r["neg_obj"] != r["obj"]
            assert r["neg_i"] in (1, 2)

    def test_deterministic(self, spark):
        from aiwhispr_spark.operators.kgscore import negative_samples

        t = self._triples(spark)
        a = sorted(map(tuple, negative_samples(t).collect()))
        b = sorted(map(tuple, negative_samples(t).collect()))
        assert a == b

    def test_at_most_per_triple_negatives(self, spark):
        from aiwhispr_spark.operators.kgscore import negative_samples

        t = self._triples(spark)
        counts = (
            negative_samples(t, per_triple=2)
            .groupBy("subj", "pred", "obj")
            .count()
            .collect()
        )
        assert all(r["count"] <= 2 for r in counts)
