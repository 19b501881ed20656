"""Model-quality estimation over pipeline outputs — calibration bins/ECE
for the quality classifier, position-based click-model attractiveness for
search-result feedback, and exact-integer OLS for scaling-law fits.

These grade the ARTIFACTS the engine produces (quality scores, rankings,
loss-vs-size curves), the step after ``evaluation.py``'s set-overlap
metrics.  The reference has no model-eval surface (it stops at indexing,
`python/index-service/`); this belongs to the training-data-analytics tier
the engine adds on top.

Integer discipline (CLAUDE.md gate rules): every ratio is a scaled BIGINT
via integer ``div`` of exact integer sums — scores arrive pre-scaled
(``score_i`` in [0, scale]), click-model examination weights use the
LCM-of-positions trick so 1/pos is the exact integer lcm//pos, and the OLS
normal equations are closed-form integer sums.  No float exists anywhere.

100 TB shape: all three are single-exchange aggregations onto tiny key
spaces (bins, (query, doc) pairs, fit groups) with map-side combine;
outputs are bins/pairs/groups-sized, never corpus-sized.  Nothing
collects to the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_SCALE = 10_000


def calibration_bins(
    scored: DataFrame,
    score_col: str = "score_i",
    label_col: str = "label",
    n_bins: int = 10,
    scale: int = _SCALE,
) -> DataFrame:
    """Reliability-diagram bins + the expected-calibration-error row.

    ``score_col`` is a pre-scaled integer confidence in [0, scale];
    ``label_col`` is 0/1.  Per bin b = min(score*n_bins div scale,
    n_bins-1): (bin, n, mean_score_i, pos_rate_i, gap_i) with
    mean_score_i = sum(score) div n, pos_rate_i = sum(label)*scale div n,
    gap_i = |mean_score_i − pos_rate_i|.  A final bin = -1 row carries
    ECE_i = Σ_b(n_b · gap_b) div N (Naeini et al. 2015's ECE, scaled).

    Scale: one exchange onto ≤ n_bins keys, then a broadcast-sized total.
    """
    per = (
        scored.select(
            F.least(
                F.expr(f"CAST({score_col} AS BIGINT) * {n_bins} div {scale}"),
                F.lit(n_bins - 1).cast("long"),
            ).alias("bin"),
            F.col(score_col).cast("long").alias("s"),
            F.col(label_col).cast("long").alias("y"),
        )
        .groupBy("bin")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("s").alias("ssum"),
            F.sum("y").alias("ysum"),
        )
        .select(
            "bin",
            "n",
            F.expr("ssum div n").alias("mean_score_i"),
            F.expr(f"(ysum * {scale}) div n").alias("pos_rate_i"),
        )
        .withColumn("gap_i", F.abs(F.col("mean_score_i") - F.col("pos_rate_i")))
    )
    ece = per.agg(
        F.lit(-1).cast("long").alias("bin"),
        F.sum("n").alias("n"),
        F.lit(None).cast("long").alias("mean_score_i"),
        F.lit(None).cast("long").alias("pos_rate_i"),
        F.expr("sum(n * gap_i) div sum(n)").alias("gap_i"),
    )
    return per.unionByName(ece)


def pbm_attractiveness(
    impressions: DataFrame,
    query_col: str = "query_id",
    doc_col: str = "item_id",
    pos_col: str = "pos",
    click_col: str = "clicked",
    max_pos: int = 5,
    scale: int = _SCALE,
) -> DataFrame:
    """Position-based click-model attractiveness with known examination.

    PBM (Craswell et al. 2008): P(click) = attractiveness(q,d) · γ(pos).
    With the examination curve FIXED at γ(p) = 1/p, the MLE is
    a(q,d) = Σ clicks / Σ γ(pos over impressions) — no EM needed.  The
    1/p sum is kept exact: lcm = LCM(1..max_pos), each impression
    contributes the integer lcm div pos, and
    attract_i = Σclicks · lcm · scale div Σ(lcm div pos).

    Output: (query_col, doc_col, n_impr, n_clicks, exam_w, attract_i).
    Scale: one exchange keyed on (q, d) with map-side combine; the output
    is catalogue-sized, not log-sized.
    """
    lcm = 1
    for p in range(2, max_pos + 1):
        g, a0 = p, lcm
        while g:
            a0, g = g, a0 % g
        lcm = lcm * p // a0
    return (
        impressions.groupBy(query_col, doc_col)
        .agg(
            F.count(F.lit(1)).alias("n_impr"),
            F.sum(F.col(click_col).cast("long")).alias("n_clicks"),
            F.sum(F.expr(f"{lcm} div CAST({pos_col} AS BIGINT)")).alias(
                "exam_w"
            ),
        )
        .withColumn(
            "attract_i",
            F.expr(f"(n_clicks * {lcm} * {scale}) div exam_w"),
        )
    )


def ols_fit_by(
    points: DataFrame,
    by: str,
    x_col: str = "x",
    y_col: str = "y",
    scale: int = _SCALE,
) -> DataFrame:
    """Per-group ordinary-least-squares line over INTEGER (x, y) points.

    The scaling-law workhorse (Kaplan et al. 2020 fit loss vs log-size;
    with x already an integer exponent the log-log fit IS a linear fit).
    Closed-form normal equations on exact BIGINT sums:
    slope_i = (n·Σxy − Σx·Σy)·scale div (n·Σx² − (Σx)²), then
    intercept_i = (Σy·scale − slope_i·Σx) div n (slope_i substituted so
    the intermediate stays integral).  Groups with a degenerate x spread
    (denominator 0) emit NULLs rather than a fabricated fit.

    Output: (by, n, slope_i, intercept_i).  Scale: one exchange onto the
    group key with map-side combine over 5 running sums.
    """
    x = F.col(x_col).cast("long")
    y = F.col(y_col).cast("long")
    agg = points.groupBy(by).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(x).alias("sx"),
        F.sum(y).alias("sy"),
        F.sum(x * y).alias("sxy"),
        F.sum(x * x).alias("sxx"),
    )
    return (
        agg.withColumn(
            "slope_i",
            F.expr(
                f"CASE WHEN n * sxx - sx * sx <> 0 THEN "
                f"((n * sxy - sx * sy) * {scale}) div (n * sxx - sx * sx) END"
            ),
        )
        .withColumn(
            "intercept_i",
            F.expr(
                f"CASE WHEN slope_i IS NOT NULL THEN "
                f"(sy * {scale} - slope_i * sx) div n END"
            ),
        )
        .select(by, "n", "slope_i", "intercept_i")
    )
