"""E5: embedding-based entity linking (mention → candidate).

Reuses the reference's cosine-similarity search semantics (Q1,
searchService.py:73-97; score convention 6_Semantic_Search.py:137-142) as a
*batch join*: every distinct mention is scored against every candidate entity,
and ``row_number() over (partition by mention order by score desc) = 1`` picks
the link — the set-oriented form of running the reference's top-k search once
per mention.

Scale strategy (two physical paths, same semantics):

* ``broadcast`` (default): candidate tables are small (10^5-10^6 entities ×
  64-768 floats fits executor memory) → broadcast-hash join, no shuffle of the
  mention side.  The mention side is first reduced to DISTINCT mentions —
  at 10^12 docs the distinct-mention set is orders of magnitude smaller than
  the triple stream, and the final link is re-attached with a second broadcast
  join keyed on the mention string.
* ``lsh``: when candidates outgrow a broadcast, block the crossing on shared
  alias shingles (same blocking machinery as canonicalize.py) so each mention
  meets only lexically plausible candidates instead of the full candidate set.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.udfs import alias_shingles_udf, cosine_cols_expr, embed_udf


def link_mentions(
    mentions: DataFrame,
    candidates: DataFrame,
    mention_col: str = "mention",
    cand_col: str = "entity",
    cand_vec_col: str = "embedding",
    strategy: str = "broadcast",
    min_score: float = 0.0,
) -> DataFrame:
    """Return (mention, entity, link_score) with exactly one row per distinct
    mention (argmax candidate by cosine; ties broken on entity asc)."""
    distinct_mentions = (
        mentions.select(F.col(mention_col).alias("mention"))
        .filter(F.col("mention").isNotNull())
        .distinct()
        .withColumn("mention_vec", embed_udf(F.col("mention")))
    )
    cands = candidates.select(
        F.col(cand_col).alias("entity"), F.col(cand_vec_col).alias("cand_vec")
    )

    if strategy == "broadcast":
        pairs = distinct_mentions.join(F.broadcast(cands))
    elif strategy == "lsh":
        m = distinct_mentions.withColumn(
            "shingle", F.explode(alias_shingles_udf(F.col("mention")))
        )
        c = cands.withColumn("shingle", F.explode(alias_shingles_udf(F.col("entity"))))
        pairs = m.join(c, "shingle").drop("shingle").dropDuplicates(["mention", "entity"])
    else:
        raise ValueError(f"unknown linking strategy: {strategy}")

    scored = pairs.withColumn("link_score", cosine_cols_expr("mention_vec", "cand_vec"))
    w = Window.partitionBy("mention").orderBy(F.col("link_score").desc(), F.col("entity"))
    return (
        scored.withColumn("_rn", F.row_number().over(w))
        .filter((F.col("_rn") == 1) & (F.col("link_score") >= min_score))
        .select("mention", "entity", "link_score")
    )


def link_triples(
    triples: DataFrame,
    candidates: DataFrame,
    cand_col: str = "entity",
    cand_vec_col: str = "embedding",
    strategy: str = "broadcast",
) -> DataFrame:
    """Attach subj_link / obj_link to a triple stream.  The (small) mention→link
    map is broadcast back onto the (huge) triple stream — the triple side never
    shuffles."""
    mentions = triples.select(F.col("subj").alias("mention")).unionByName(
        triples.select(F.col("obj").alias("mention"))
    )
    # persist: the subj and obj broadcast arms below would otherwise each
    # re-run the full linker (embed UDF + candidate join + window)
    links = link_mentions(
        mentions, candidates, cand_col=cand_col, cand_vec_col=cand_vec_col, strategy=strategy
    ).persist()
    subj_map = F.broadcast(
        links.select(
            F.col("mention").alias("subj"),
            F.col("entity").alias("subj_link"),
            F.col("link_score").alias("subj_link_score"),
        )
    )
    obj_map = F.broadcast(
        links.select(
            F.col("mention").alias("obj"),
            F.col("entity").alias("obj_link"),
            F.col("link_score").alias("obj_link_score"),
        )
    )
    return triples.join(subj_map, "subj", "left").join(obj_map, "obj", "left")
