"""Large-corpus full-pipeline stress (VERDICT r2 #7).

The r2 lesson: blocking-stage regressions (LSH recall → over-merge) hide
below scale — the 100k run caught what every small-corpus gate missed.  This
tool is the 10× insurance run: generate an N-doc corpus (multiprocess, a
directory of many parquet files so the scan splits), run the FULL E1-E7
pipeline with writes at local[32], and report wall time, throughput, output
table sizes, and the alias-family size distribution with the biggest
families spelled out for eyeball + invariant checks.

The corpus generator plants each entity as exactly THREE surface forms
(entity_name variants), so the structural invariant at ANY corpus size is:
no alias family exceeds 3 surfaces, and families = #entities that survived
extraction.  A blocking/canonicalization regression shows up as a giant
merged family (over-merge) or as >expected family count (under-merge).

Usage:
    python tools/stress_pipeline.py [n_docs] [workdir]
Defaults: 1_000_000 docs, /tmp/kg_stress.  Prints one JSON line; also
asserts the invariants (exit 1 on violation).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time
from concurrent.futures import ProcessPoolExecutor

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _write_shard(args) -> str:
    path, start, count, n_entities = args
    from aiwhispr_spark.sources.synthetic import _rows_to_table, generate_rows
    import pyarrow.parquet as pq

    rows = list(generate_rows(start + count, n_entities, start=start))
    pq.write_table(_rows_to_table(rows), path)
    return path


def generate_corpus(corpus_dir: str, n_docs: int, n_entities: int, n_files: int, workers: int):
    """generate_rows is deterministic per doc index, so shards are
    embarrassingly parallel (each worker materializes its own index range)."""
    os.makedirs(corpus_dir, exist_ok=True)
    per = (n_docs + n_files - 1) // n_files
    jobs = []
    for i in range(n_files):
        start = i * per
        count = min(per, n_docs - start)
        if count <= 0:
            break
        jobs.append((os.path.join(corpus_dir, f"part-{i:05d}.parquet"), start, count, n_entities))
    with ProcessPoolExecutor(max_workers=workers) as ex:
        list(ex.map(_write_shard, jobs))


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    workdir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/kg_stress"
    n_entities = 200
    corpus_dir = os.path.join(workdir, "corpus")
    out_dir = os.path.join(workdir, "out")
    shutil.rmtree(workdir, ignore_errors=True)

    t0 = time.time()
    generate_corpus(corpus_dir, n_docs, n_entities, n_files=256, workers=16)
    gen_s = time.time() - t0

    from aiwhispr_spark.session import get_spark

    spark = get_spark("kg-stress", master="local[32]", shuffle_partitions=64)
    docs = spark.read.parquet(corpus_dir)

    from aiwhispr_spark.plans.kg_pipeline import build_knowledge_graph

    t1 = time.time()
    build_knowledge_graph(
        spark, docs, output_dir=out_dir, target_partitions=64, run_id="stress"
    )
    # writes are actions; everything materialized by here
    wall = time.time() - t1

    from pyspark.sql import functions as F

    triples = spark.read.parquet(os.path.join(out_dir, "triples"))
    entities = spark.read.parquet(os.path.join(out_dir, "entities"))
    n_triples = triples.count()
    fam = entities.select(
        "entity_id", F.size("aliases").alias("n_aliases"), "aliases"
    ).orderBy(F.col("n_aliases").desc(), "entity_id")
    top = [
        {"entity_id": r["entity_id"], "n_aliases": r["n_aliases"], "aliases": list(r["aliases"])}
        for r in fam.limit(5).collect()
    ]
    n_entities_out = entities.count()
    report = {
        "n_docs": n_docs,
        "gen_sec": round(gen_s, 1),
        "pipeline_sec": round(wall, 1),
        "docs_per_sec": round(n_docs / wall, 1),
        "n_triples": n_triples,
        "n_entities": n_entities_out,
        "biggest_families": top,
    }
    print(json.dumps(report))
    with open(os.path.join(workdir, "report.json"), "w") as f:
        json.dump(report, f, indent=1)

    # structural invariants (the corpus plants exactly 3 surfaces per entity)
    max_fam = top[0]["n_aliases"] if top else 0
    assert max_fam <= 3, f"OVER-MERGE: alias family of size {max_fam}: {top[0]}"
    # under-merge: ~160/200 planted entities survive extraction at every
    # measured size (20k and 1M), each as ONE 3-surface family.  Zero merging
    # (the degenerate-banding failure class) yields ~3× that — so the bound
    # must sit near the planted-entity count, NOT at 3×n_entities (which a
    # total blocking failure would still satisfy).
    assert n_entities_out <= 1.25 * n_entities, (
        f"UNDER-MERGE: {n_entities_out} families vs ~{n_entities} planted entities"
    )
    spark.stop()


if __name__ == "__main__":
    main()
