"""Cross-lingual entity alias mining: align the SUBJECTS of triples mined
from translated page families via language-invariant objects — the
multilingual stage of alias discovery (operators/canonicalize.py merges
same-language surface variants; this proposes "Acme GmbH" ≡ "Acme Inc"
across the de/en versions of one page family).

Inputs compose two existing products:
* ``members`` — (cluster, url, lang) translation families from
  operators/hreflang.py::hreflang_clusters (or any equivalent table);
* ``triples`` — (url, subj, pred, obj) page-attributed facts (E3 output).

Alignment contract (oracle-mirrored): two subjects from DIFFERENT
languages of the SAME cluster are alias candidates iff they assert the
same (pred, obj) fact — objects that survive translation (numbers, dates,
shared proper names) are the anchors; language-variant objects simply
never equal each other and contribute nothing.  Output one row per
(cluster, lang_a, subj_a, lang_b, subj_b) with ``n_shared`` anchoring
facts, lang_a < lang_b; a (cluster, lang) pair with MULTIPLE distinct
subjects keeps every candidate (downstream canonicalization votes).

100 TB shape: one url-keyed hash join (triples ⋈ members — members is
|pages|-scale, co-partitionable), then a self-join keyed on
(cluster, pred, obj): fan-out is Σ per-fact subject count², the wedge
discipline (operators/kgsummary.py), never a cluster cross product.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def cross_lingual_aliases(
    members: DataFrame,
    triples: DataFrame,
    min_shared: int = 1,
) -> DataFrame:
    """(cluster, lang_a, subj_a, lang_b, subj_b, n_shared) — see module
    contract.  ``members`` columns: (cluster, url, lang); ``triples``
    columns: (url, subj, pred, obj)."""
    tagged = (
        triples.select("url", "subj", "pred", "obj")
        .join(members.select("url", "cluster", "lang"), "url")
        .select("cluster", "lang", "subj", "pred", "obj")
        .distinct()
    )
    pairs = (
        tagged.alias("a")
        .join(
            tagged.alias("b"),
            (F.col("a.cluster") == F.col("b.cluster"))
            & (F.col("a.pred") == F.col("b.pred"))
            & (F.col("a.obj") == F.col("b.obj"))
            & (F.col("a.lang") < F.col("b.lang")),
        )
        .groupBy(
            F.col("a.cluster").alias("cluster"),
            F.col("a.lang").alias("lang_a"),
            F.col("a.subj").alias("subj_a"),
            F.col("b.lang").alias("lang_b"),
            F.col("b.subj").alias("subj_b"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n_shared"))
        .filter(F.col("n_shared") >= int(min_shared))
    )
    return pairs
