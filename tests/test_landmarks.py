"""Landmark distance-sketch semantics (graph.py): admissible upper bound,
exactness through landmarks, unreachable sentinel."""

from __future__ import annotations


def _e(spark, rows):
    return spark.createDataFrame(rows, "src string, dst string")


def test_landmark_estimates_admissible_and_exact_through_hub(spark):
    from aiwhispr_spark.operators.graph import landmark_distance_eval

    # star through hub h (highest degree → guaranteed landmark):
    # every shortest path crosses h, so every estimate is EXACT
    rows = [("h", f"s{i}") for i in range(4)] + [(f"s{i}", "h") for i in range(4)]
    out = landmark_distance_eval(_e(spark, rows), n_landmarks=1, hops=4).collect()
    assert out
    for r in out:
        assert r.est_d >= r.exact_d        # triangle-inequality bound
        assert r.est_d == r.exact_d        # all paths pass the landmark
        assert r.stretch_bp == 10000


def test_landmark_stretch_on_shortcut_edge(spark):
    from aiwhispr_spark.operators.graph import landmark_distance_eval

    # hub h sees everything, but a↔b also have a direct edge the
    # landmark path doesn't use: exact 1, estimate 2 → stretch 2×
    rows = [
        ("a", "h"), ("h", "a"), ("b", "h"), ("h", "b"),
        ("c", "h"), ("h", "c"),
        ("a", "b"),
    ]
    out = {(r.u, r.v): r for r in landmark_distance_eval(
        _e(spark, rows), n_landmarks=1, hops=4).collect()}
    r = out[("a", "b")]
    assert (r.exact_d, r.est_d, r.stretch_bp) == (1, 2, 20000)


def test_landmark_unreachable_sentinel(spark):
    from aiwhispr_spark.operators.graph import landmark_distance_eval

    # two components; landmark budget 1 lands in the bigger one → pairs
    # inside the other component estimate -1
    rows = [
        ("a", "h"), ("h", "b"), ("a", "b"),
        ("x", "y"),
    ]
    out = {(r.u, r.v): r for r in landmark_distance_eval(
        _e(spark, rows), n_landmarks=1, hops=4).collect()}
    r = out[("x", "y")]
    assert (r.est_d, r.stretch_bp) == (-1, -1)
