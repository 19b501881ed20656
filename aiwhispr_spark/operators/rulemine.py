"""AMIE-style horn-rule mining over the triple store (Galárraga et al.,
WWW '13 "AMIE: Association Rule Mining under Incomplete Evidence"):
closed path rules of the shape

    body1(x, z) ∧ body2(z, y)  ⇒  head(x, y)

scored by support, standard confidence, head coverage, and PCA
confidence — the KG-completion counterpart of the deductive layer
(graph_query.bgp_match evaluates a known rule; this MINES the rules).

Metrics (every ratio an exact scaled integer, the repo-wide `div`
discipline):

* ``support``      — #DISTINCT (x, y) satisfying body AND head;
* ``n_body``       — #DISTINCT (x, y) satisfying the body;
* ``n_head``       — #facts of the head relation;
* ``n_pca``        — #body pairs (x, y) where x has at least ONE head
                     fact (the Partial Completeness Assumption
                     denominator: unknown facts of known subjects count
                     against the rule, wholly-unknown subjects do not);
* ``conf_i``       — support·scale div n_body  (standard confidence);
* ``hc_i``         — support·scale div n_head  (head coverage);
* ``pca_conf_i``   — support·scale div n_pca.

Variable instantiations are NOT required to be pairwise distinct
(x = y or x = z matches, exactly as the SQL joins read) — documented
subset, mirrored by the oracle.

100 TB shape: body candidates come from ONE wedge join keyed on the
shared entity z (fan-out Σ deg_in(z)·deg_out(z), the triangle/link-
prediction bound — never a relation cross-product); the distinct over
(r1, r2, x, y) is the corpus-wide shuffle and carries four fixed-width
columns.  The three denominators are |rules|- and |relations|-sized
aggregates joined back BROADCAST.  Skewed hub entities take the
degree-cap/salting treatment (operators/skew.py) before the wedge, and
a relation-frequency prefilter (``min_head_facts``) prunes rare heads
before any join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def mine_horn_rules(
    triples: DataFrame,
    min_support: int = 2,
    min_head_facts: int = 1,
    subj_col: str = "subj",
    pred_col: str = "pred",
    obj_col: str = "obj",
    scale: int = 10_000,
) -> DataFrame:
    """(body1, body2, head, support, n_body, n_head, n_pca, conf_i, hc_i,
    pca_conf_i) — one row per mined rule with support ≥ ``min_support``."""
    facts = triples.select(
        F.col(subj_col).alias("s"),
        F.col(pred_col).alias("p"),
        F.col(obj_col).alias("o"),
    ).distinct()

    # wedge on the shared entity z: body1(x, z) ∧ body2(z, y)
    left = facts.select(
        F.col("s").alias("x"), F.col("p").alias("body1"), F.col("o").alias("z")
    )
    right = facts.select(
        F.col("s").alias("z"), F.col("p").alias("body2"), F.col("o").alias("y")
    )
    body = left.join(right, "z").select("body1", "body2", "x", "y").distinct()

    n_body = body.groupBy("body1", "body2").agg(
        F.count(F.lit(1)).cast("long").alias("n_body")
    )

    heads = facts.select(
        F.col("s").alias("x"), F.col("p").alias("head"), F.col("o").alias("y")
    )
    if min_head_facts > 1:
        big = (
            heads.groupBy("head")
            .agg(F.count(F.lit(1)).alias("_n"))
            .where(F.col("_n") >= min_head_facts)
            .select("head")
        )
        heads = heads.join(F.broadcast(big), "head")
    support = body.join(heads, ["x", "y"]).groupBy("body1", "body2", "head").agg(
        F.count(F.lit(1)).cast("long").alias("support")
    )

    n_head = heads.groupBy("head").agg(
        F.count(F.lit(1)).cast("long").alias("n_head")
    )

    # PCA denominator: body pairs whose x is a KNOWN subject of the head
    head_subjects = heads.select("x", "head").distinct()
    n_pca = (
        body.join(head_subjects, "x")
        .select("body1", "body2", "head", "x", "y")
        .distinct()
        .groupBy("body1", "body2", "head")
        .agg(F.count(F.lit(1)).cast("long").alias("n_pca"))
    )

    sc = int(scale)
    return (
        support.where(F.col("support") >= int(min_support))
        .join(n_body, ["body1", "body2"])
        .join(F.broadcast(n_head), "head")
        .join(n_pca, ["body1", "body2", "head"])
        .select(
            "body1",
            "body2",
            "head",
            "support",
            "n_body",
            "n_head",
            "n_pca",
            F.expr(f"support * {sc} div n_body").cast("long").alias("conf_i"),
            F.expr(f"support * {sc} div n_head").cast("long").alias("hc_i"),
            F.expr(f"support * {sc} div n_pca").cast("long").alias("pca_conf_i"),
        )
    )


def association_rules_2item(
    df,
    basket_col: str,
    item_col: str,
    min_support: int = 5,
    scale: int = 1_000_000,
):
    """Market-basket association rules over 2-itemsets (Agrawal/Srikant
    Apriori '94): support, confidence, lift for every directed rule a→b
    whose PAIR support ≥ ``min_support`` baskets.  Distinct items per
    basket; the Apriori downward-closure prune filters items to frequent
    ones BEFORE the per-basket pair fan-out, so a basket contributes
    C(k_frequent, 2) pairs, never C(k_all, 2).

    Integer contract: support_mi = supp_pair·scale div N, conf_mi =
    supp_pair·scale div supp_ante, lift_mi = supp_pair·N·scale div
    (supp_ante·supp_cons) — all exact BIGINT cross-multiplication.  The
    lift numerator scale·psup·N stays in BIGINT while psup·N < 9.2e12;
    at web scale drop ``scale`` to 1e3 or compute lift in DECIMAL(38) —
    the floor-once contract is what the gate pins.

    100 TB shape: item supports and pair supports are map-side-combinable
    aggregates over (item)/(a,b) keys; the basket-total N rides as a
    broadcast literal aggregate; per-basket fan-out is bounded by the
    frequent-item count (min_support is the hub guard — raise it and the
    candidate space shrinks quadratically)."""
    from pyspark.sql import functions as F

    b = df.select(F.col(basket_col).alias("bid"), F.col(item_col).alias("item")).distinct()
    isup = b.groupBy("item").agg(F.count(F.lit(1)).cast("long").alias("isup"))
    freq = isup.filter(F.col("isup") >= min_support)
    fb = b.join(F.broadcast(freq.select("item")), "item")
    pairs = (
        fb.alias("l")
        .join(fb.alias("r"), "bid")
        .filter(F.col("l.item") < F.col("r.item"))
        .groupBy(F.col("l.item").alias("ia"), F.col("r.item").alias("ib"))
        .agg(F.count(F.lit(1)).cast("long").alias("psup"))
        .filter(F.col("psup") >= min_support)
    )
    n_total = b.select("bid").distinct().agg(
        F.count(F.lit(1)).cast("long").alias("n_baskets")
    )
    fwd = pairs.select(
        F.col("ia").alias("antecedent"), F.col("ib").alias("consequent"), "psup"
    )
    bwd = pairs.select(
        F.col("ib").alias("antecedent"), F.col("ia").alias("consequent"), "psup"
    )
    rules = (
        fwd.unionByName(bwd)
        .join(
            F.broadcast(freq.select(F.col("item").alias("antecedent"),
                                    F.col("isup").alias("supp_ante"))),
            "antecedent",
        )
        .join(
            F.broadcast(freq.select(F.col("item").alias("consequent"),
                                    F.col("isup").alias("supp_cons"))),
            "consequent",
        )
        .crossJoin(F.broadcast(n_total))
    )
    s = int(scale)
    return rules.select(
        "antecedent",
        "consequent",
        F.col("psup").alias("supp_pair"),
        "supp_ante",
        "supp_cons",
        F.expr(f"CAST(({s} * psup) div n_baskets AS BIGINT)").alias("support_mi"),
        F.expr(f"CAST(({s} * psup) div supp_ante AS BIGINT)").alias("conf_mi"),
        F.expr(
            f"CAST(({s} * psup * n_baskets) div (supp_ante * supp_cons) AS BIGINT)"
        ).alias("lift_mi"),
    )
