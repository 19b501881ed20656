"""Hardware scaling ceiling measurement (no Spark): the fused KG kernel run
under raw multiprocessing at increasing worker counts.  Establishes what the
BOX can do, so Spark's measured N→4N efficiency can be judged against the
hardware rather than against an impossible ideal.

Measured 2026-08-16 on this sandbox (32 vCPU ≈ 16 physical + SMT):
  1: 716 docs/s   2: 1326   4: 2535   6: 3252   8: 4727
  12: 5614        16: 6687  24: 7329  32: ~6900
→ 2→8 procs efficiency 0.89; 8→32 only 0.37.  Hence bench.py evidences the
north rule's N→4N scaling at local[2]→local[8].
"""

from __future__ import annotations

import multiprocessing as mp
import sys
import time

sys.path.insert(0, "/root/repo")

from aiwhispr_spark import kernels  # noqa: E402
from aiwhispr_spark.triples import extract_triples  # noqa: E402


def work(htmls):
    n = 0
    for h in htmls:
        text = kernels.file_roundtrip(kernels.clean_html(h.decode("utf-8")))
        for chunk in kernels.bucket_fill_chunks(text, 700):
            n += len(extract_triples(chunk))
    return n


def main():
    import bench

    n_docs = 16000
    import pyarrow.parquet as pq

    table = pq.read_table(bench.corpus_path(max(n_docs, 30000)))
    htmls = table["html"].to_pylist()[:n_docs]
    for workers in (1, 2, 4, 8, 16, 32):
        parts = [htmls[i::workers] for i in range(workers)]
        t0 = time.time()
        with mp.Pool(workers) as pool:
            pool.map(work, parts)
        dt = time.time() - t0
        print(f"{workers:3d} procs: {n_docs / dt:7.0f} docs/s")


if __name__ == "__main__":
    main()
