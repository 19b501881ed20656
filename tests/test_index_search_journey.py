"""The reference's product loop, end to end: index a corpus (extract → chunk
→ embed → chunk store) then search it (encode query → exact top-k cosine →
score/rank munging → reassembly) — README.md's index_content_site +
searchService workflow as one Spark dataflow."""

from __future__ import annotations

from pyspark.sql import functions as F

from aiwhispr_spark.embedding import hash_embed
from aiwhispr_spark.functions.udfs import embed_udf
from aiwhispr_spark.operators.qa import ordered_concat
from aiwhispr_spark.operators.topk import cosine_topk, rank_tiers, score_to_distance
from aiwhispr_spark.plans.kg_pipeline import docs_to_chunks


def test_index_then_search_roundtrip(spark, corpus_path):
    docs = spark.read.parquet(corpus_path)

    # --- index: docs → chunks → embeddings (the ContentChunkMap build) ---
    chunks = docs_to_chunks(docs).withColumn("embedding", embed_udf(F.col("text_chunk")))
    chunks = chunks.persist()
    assert chunks.filter(F.size("embedding") != 64).count() == 0

    # --- search: a query built from a REAL chunk's vocabulary must rank a
    # chunk of that document first (hash embeddings: shared tokens ⇒ high cos)
    probe = chunks.orderBy("url", "chunk_no").first()
    qvec = hash_embed(probe["text_chunk"])  # same token multiset ⇒ cos = 1.0

    hits = cosine_topk(chunks, qvec, k=25)
    hits = rank_tiers(hits).withColumn("distance", score_to_distance(F.col("match_score")))
    got = hits.collect()
    assert len(got) == 25
    assert got[0]["url"] == probe["url"], (got[0]["url"], probe["url"])
    assert got[0]["match_score"] > 0.999
    # Q8 tiers: 5 blue, 5 orange, rest red, in rank order
    assert [r["tier"] for r in got] == ["blue"] * 5 + ["orange"] * 5 + ["red"] * 15
    # Q2 distance convention
    assert abs((1.0 - got[0]["match_score"]) - got[0]["distance"]) < 1e-9

    # --- G3 reassembly: the hit document rebuilds byte-identically from its
    # ordered chunks (typesenseVectorDb.py:361-400 / postgres ORDER BY path)
    doc_chunks = chunks.filter(F.col("url") == probe["url"]).withColumn(
        "ord", F.struct(F.col("chunk_no"))
    )
    rebuilt = ordered_concat(doc_chunks, "url", "ord", "text_chunk", out_col="doc").first()["doc"]
    full = "".join(
        r["text_chunk"]
        for r in chunks.filter(F.col("url") == probe["url"]).orderBy("chunk_no").collect()
    )
    assert rebuilt == full
    chunks.unpersist()
