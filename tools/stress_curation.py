"""Web-curation throughput stress: run plans/curation.py::curate_corpus
(main-content → T1 → corpus-level line dedup → PII redact → exact-dedup
keepers) end-to-end with a parquet write over an N-doc synthetic crawl, at
local[32], one fresh JVM.

Reports docs/s plus the line-dedup effect (boilerplate lines actually
dropped — the make_doc_html corpus plants the fish&chips paragraph in every
3rd doc and the escaped-pseudo-tag paragraph in every 5th, so the frequent-
line pass must do real work, not run vacuously).

Usage: python tools/stress_curation.py [n_docs] [workdir]
Defaults: 100_000 docs, /tmp/curation_stress.  Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.stress_pipeline import generate_corpus  # noqa: E402


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    workdir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/curation_stress"
    corpus_dir = os.path.join(workdir, "corpus")
    out_dir = os.path.join(workdir, "curated")
    if not os.path.isdir(corpus_dir) or len(os.listdir(corpus_dir)) == 0:
        t0 = time.time()
        generate_corpus(corpus_dir, n_docs, n_entities=200, n_files=256, workers=16)
        gen_s = round(time.time() - t0, 1)
    else:
        gen_s = 0.0
    shutil.rmtree(out_dir, ignore_errors=True)

    from aiwhispr_spark.plans.curation import curate_corpus
    from aiwhispr_spark.session import get_spark

    spark = get_spark("curation-stress", master="local[32]", shuffle_partitions=64)
    docs = spark.read.parquet(corpus_dir)
    t0 = time.time()
    curated = curate_corpus(docs, min_line_docs=3, max_link_pct=50)
    curated.write.mode("overwrite").parquet(out_dir)
    wall = time.time() - t0

    res = spark.read.parquet(out_dir)
    from pyspark.sql import functions as F

    agg = res.agg(
        F.count(F.lit(1)).alias("docs_out"),
        F.sum("n_lines_kept").alias("lines_kept"),
        F.sum("n_lines_dropped").alias("lines_dropped"),
    ).first()
    print(
        json.dumps(
            {
                "n_docs": n_docs,
                "corpus_gen_s": gen_s,
                "curation_wall_s": round(wall, 1),
                "docs_per_sec": round(n_docs / wall, 1),
                "docs_out": agg.docs_out,
                "boilerplate_lines_dropped": int(agg.lines_dropped),
                "kept_lines": int(agg.lines_kept),
            }
        )
    )
    assert agg.lines_dropped > 0, "line dedup ran vacuously — fixture regression"


if __name__ == "__main__":
    main()
