"""VERDICT r4 #6: measure realized batched-BPE batch sizes and wall-clock at
a production-scale merge count (n >= 512) and verify batched ≡ sequential.

The 3·C conflict margin is provably safe but could collapse to the argmax
fallback (batch size 1) on Zipfian corpora; this records what actually
happens.  Results go to BASELINE.md.

Usage: python tools/bpe_batch_measure.py [n_merges] [sf_dir]
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

from aiwhispr_spark.operators.textstats import bpe_train_batched  # noqa: E402
from aiwhispr_spark.session import get_spark  # noqa: E402


def main():
    n_merges = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    spark = get_spark("bpe-measure", master="local[16]", shuffle_partitions=16)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").persist()
    docs.count()

    log: list[int] = []
    t0 = time.time()
    batched = bpe_train_batched(
        docs, n_merges=n_merges, batch_m=8, batch_log=log
    ).collect()
    t_batched = time.time() - t0

    t0 = time.time()
    sequential = bpe_train_batched(docs, n_merges=n_merges, batch_m=1).collect()
    t_seq = time.time() - t0

    b = [(r["step"], r["x"], r["y"], r["n"]) for r in batched]
    s = [(r["step"], r["x"], r["y"], r["n"]) for r in sequential]
    from collections import Counter

    dist = dict(sorted(Counter(log).items()))
    out = {
        "n_merges_requested": n_merges,
        "n_merges_realized": len(b),
        "identical_to_sequential": b == s,
        "rounds_batched": len(log),
        "rounds_sequential": len(s),
        "realized_batch_distribution": dist,
        "mean_batch": round(sum(log) / len(log), 2) if log else 0,
        "wall_batched_s": round(t_batched, 1),
        "wall_sequential_s": round(t_seq, 1),
        "speedup": round(t_seq / t_batched, 2) if t_batched else None,
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
