"""Property-based gates for greedy sequence packing (operators/packing.py).

Invariants that must hold for ANY token-count distribution:
* within a (shard, seq_id), total tokens ≤ capacity UNLESS the sequence is a
  single oversized document;
* offsets are the running prefix sums within their sequence (contiguous, no
  holes, no overlap);
* packing is greedy: a document NEVER starts a new sequence if it would have
  fit in the previous one;
* every input doc appears exactly once.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

CAPACITY = 64


def _pack_reference(tokens: list[int]) -> list[tuple[int, int]]:
    """Driver-side greedy twin: (seq_id, offset) per doc in id order."""
    out = []
    acc, seq = 0, -1
    for t in tokens:
        if seq < 0 or acc + t > CAPACITY:
            seq += 1
            acc = 0
        out.append((seq, acc))
        acc += t
    return out


@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    st.lists(st.integers(min_value=0, max_value=100), min_size=1, max_size=40),
    st.integers(min_value=1, max_value=3),
)
def test_pack_greedy_invariants(spark, token_lists_seed, n_shards):
    import random

    from pyspark.sql import functions as F

    from aiwhispr_spark.operators.packing import pack_greedy

    rng = random.Random(sum(token_lists_seed) + n_shards)
    rows = []
    doc_id = 0
    per_shard: dict[str, list[tuple[int, int]]] = {}
    for t in token_lists_seed:
        shard = f"s{rng.randrange(n_shards)}"
        rows.append((shard, doc_id, t))
        per_shard.setdefault(shard, []).append((doc_id, t))
        doc_id += 1

    df = spark.createDataFrame(rows, "shard string, doc_id long, n_tokens int")
    got = {
        (r["shard"], r["doc_id"]): (r["seq_id"], r["seq_offset"], r["n_tokens"])
        for r in pack_greedy(df, CAPACITY).collect()
    }
    assert len(got) == len(rows)  # every doc exactly once

    for shard, docs in per_shard.items():
        docs = sorted(docs)
        expected = _pack_reference([t for _, t in docs])
        for (did, t), (eseq, eoff) in zip(docs, expected):
            seq, off, nt = got[(shard, did)]
            assert (seq, off, nt) == (eseq, eoff, t), (shard, did)
        # capacity invariant per sequence
        by_seq: dict[int, int] = {}
        for (did, t), (eseq, _) in zip(docs, expected):
            by_seq[eseq] = by_seq.get(eseq, 0) + t
        singles = {}
        for (did, t), (eseq, _) in zip(docs, expected):
            singles.setdefault(eseq, []).append(t)
        for seq, total in by_seq.items():
            assert total <= CAPACITY or len(singles[seq]) == 1
