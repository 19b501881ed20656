"""Sequence packing for LLM training batches.

Greedy bin-packing of documents into fixed-token-capacity training sequences
— the step between a cleaned corpus and a tokenized training shard.  New
component (the reference stops at embedding); semantics follow the common
greedy-concat packers: within a shard, documents are taken in a deterministic
order and appended to the open sequence until the next document would
overflow `capacity`, which starts a new sequence.  A document larger than
`capacity` occupies its own sequence (never split — splitting is the
chunker's job, upstream).

Scale design: packing is stateful-sequential, so it runs per SHARD via
``applyInPandas`` — shards (e.g. source, date bucket) partition the corpus
into independent streams that pack in parallel; no global order, no driver
state.  The output (doc → (shard, seq_id, offset)) is a plan for the
writer, not a materialization: actual token concat happens at write time.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

PACK_SCHEMA = StructType(
    [
        StructField("shard", StringType()),
        StructField("doc_id", LongType()),
        StructField("n_tokens", IntegerType()),
        StructField("seq_id", IntegerType()),
        StructField("seq_offset", IntegerType()),
    ]
)


def pack_greedy(
    df: DataFrame,
    capacity: int,
    shard_col: str = "shard",
    id_col: str = "doc_id",
    tokens_col: str = "n_tokens",
    carry: tuple[str, ...] = (),
) -> DataFrame:
    """(shard, doc_id, n_tokens, seq_id, seq_offset[, *carry]): greedy
    packing per shard, documents ordered by id within the shard
    (deterministic — the same input always packs identically, so
    resume/retry re-derive the same plan).  ``carry`` columns ride through
    the python stage unchanged so a composed plan (plans/training.py) can
    keep per-doc attributes WITHOUT re-joining against — and therefore
    re-executing — its own upstream lineage."""
    from pyspark.sql import functions as F

    prepared = df.select(
        F.col(shard_col).cast("string").alias("shard"),
        F.col(id_col).cast("long").alias("doc_id"),
        F.col(tokens_col).cast("int").alias("n_tokens"),
        *[F.col(c) for c in carry],
    )
    if carry:
        schema = StructType(
            list(prepared.schema.fields)
            + [
                StructField("seq_id", IntegerType()),
                StructField("seq_offset", IntegerType()),
            ]
        )
    else:
        schema = PACK_SCHEMA

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("doc_id").reset_index(drop=True)
        seqs, offs = [], []
        acc, seq = 0, -1
        for t in pdf["n_tokens"]:
            t = int(t)
            if seq < 0 or acc + t > capacity:
                seq += 1
                acc = 0
            seqs.append(seq)
            offs.append(acc)
            acc += t
        pdf["seq_id"] = pd.Series(seqs, dtype="int32")
        pdf["seq_offset"] = pd.Series(offs, dtype="int32")
        return pdf

    return prepared.groupBy("shard").applyInPandas(pack, schema)


def passage_windows(
    docs: DataFrame,
    window: int = 64,
    stride: int = 48,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Overlapping token-window passages (the RAG-retrieval chunk shape:
    fixed ``window`` tokens advancing by ``stride``, so consecutive passages
    overlap by window − stride).  Complements the byte-compat C1 chunker
    (reference parity) with the sliding form retrieval corpora actually
    index.

    Passage starts: 1, 1+stride, … while start ≤ max(1, n − window + 1) —
    a doc of ≤ window tokens yields exactly one passage; every token lands
    in ≥ 1 passage and the final passage is never shorter than
    window − stride unless the doc itself is.

    100 TB shape: pure JVM per row — ONE split + a sequence/slice expansion
    inside codegen, no python, no shuffle until whatever the consumer does
    (tokens are bound to a lambda variable once; see functions.udfs.bound).
    """
    if window < 1 or stride < 1:
        raise ValueError("window and stride must be >= 1")
    if stride > window:
        # the 'every token lands in >= 1 passage' contract breaks silently
        # otherwise: tokens between window and stride in each block would
        # vanish from the retrieval index
        raise ValueError("stride must be <= window (gapless coverage contract)")
    from pyspark.sql import functions as F

    from ..functions.udfs import bound

    toks_expr = F.filter(
        F.split(F.trim(F.col(text_col)), r"\s+"), lambda t: t != ""
    )
    passages = bound(
        toks_expr,
        lambda toks: F.transform(
            F.sequence(
                F.lit(1),
                F.greatest(F.size(toks) - window + 1, F.lit(1)),
                F.lit(stride),
            ),
            lambda start: F.struct(
                start.alias("start"),
                F.array_join(F.slice(toks, start, window), " ").alias("passage"),
                F.least(
                    F.lit(window), F.size(toks) - start + 1
                ).alias("n_tokens"),
            ),
        ),
    )
    return (
        docs.filter(F.length(F.trim(F.col(text_col))) > 0)
        .select(
            F.col(id_col),
            F.posexplode(passages).alias("passage_no", "p"),
        )
        .select(
            id_col,
            (F.col("passage_no") + 1).cast("int").alias("passage_no"),
            F.col("p.start").cast("long").alias("start_token"),
            F.col("p.passage").alias("passage"),
            F.col("p.n_tokens").cast("long").alias("n_tokens"),
        )
    )


def span_corruption(
    docs: DataFrame,
    noise_pct: int = 15,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(doc_id, input_text, target_text, n_masked) — T5-style span
    corruption (Raffel et al. 2020): tokens are masked by a CONTENT-SEEDED
    coin (md5 of ``doc_id:position`` — rerun/retry-stable, no RNG state),
    contiguous masked runs collapse to one ``<extra_id_K>`` sentinel in the
    input, and the target is the sentinel-prefixed masked spans — the
    denoising-objective prep step between a cleaned corpus and a pretraining
    shard.

    Built as ONE array fold (``F.aggregate`` over the token array with a
    struct accumulator carrying input-so-far / target-so-far / in-run /
    run-count): pure JVM, zero shuffle, zero python — the corruption runs
    at scan speed.  The relational formulation (explode + window + two
    filtered string_aggs) is the ORACLE's job; per-token exploding a 100 TB
    corpus to decide masks would shuffle the tokenized corpus twice.
    """
    from pyspark.sql import functions as F

    did = F.col(id_col).cast("string")
    toks = F.filter(F.split(F.trim(F.col(text_col)), r"\s+"), lambda t: t != "")

    def masked(i):
        h = F.conv(
            F.substring(F.md5(F.concat(did, F.lit(":"), i.cast("string"))), 1, 4),
            16,
            10,
        ).cast("long")
        return (h % 100) < noise_pct

    items = F.transform(
        F.sequence(F.lit(0), F.size(toks) - 1),
        lambda i: F.struct(
            F.element_at(toks, i + 1).alias("tok"), masked(i).alias("m")
        ),
    )
    init = F.struct(
        F.lit("").alias("inp"),
        F.lit("").alias("tgt"),
        F.lit(False).alias("prev"),
        F.lit(0).alias("runs"),
        F.lit(0).alias("nm"),
    )

    def step(acc, x):
        sentinel = F.concat(F.lit("<extra_id_"), acc["runs"].cast("string"), F.lit(">"))
        new_run = x["m"] & ~acc["prev"]
        inp = (
            F.when(new_run, F.concat(acc["inp"], F.lit(" "), sentinel))
            .when(x["m"], acc["inp"])
            .otherwise(F.concat(acc["inp"], F.lit(" "), x["tok"]))
        )
        tgt = (
            F.when(new_run, F.concat(acc["tgt"], F.lit(" "), sentinel, F.lit(" "), x["tok"]))
            .when(x["m"], F.concat(acc["tgt"], F.lit(" "), x["tok"]))
            .otherwise(acc["tgt"])
        )
        return F.struct(
            inp.alias("inp"),
            tgt.alias("tgt"),
            x["m"].alias("prev"),
            F.when(new_run, acc["runs"] + 1).otherwise(acc["runs"]).alias("runs"),
            F.when(x["m"], acc["nm"] + 1).otherwise(acc["nm"]).alias("nm"),
        )

    agg = F.aggregate(items, init, step)
    # guard: F.sequence(0, -1) runs BACKWARDS on an empty token array, and a
    # NULL text yields a NULL token array (size() = NULL is falsy -> the
    # otherwise-branch would propagate NULL through the fold)
    empty = toks.isNull() | (F.size(toks) == 0)
    return docs.select(
        id_col,
        F.when(empty, F.lit("")).otherwise(F.ltrim(agg["inp"])).alias("input_text"),
        F.when(empty, F.lit("")).otherwise(F.ltrim(agg["tgt"])).alias("target_text"),
        F.when(empty, F.lit(0)).otherwise(agg["nm"]).cast("int").alias("n_masked"),
    )

def fim_transform(
    docs: DataFrame,
    fim_pct: int = 50,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(doc_id, mode, prefix, middle, suffix, n_prefix, n_middle, n_suffix)
    — fill-in-the-middle transformation (Bavarian et al. 2022): a
    content-seeded coin (md5 of ``doc_id:fim:g`` — rerun/retry-stable, no
    RNG state) selects ``fim_pct``% of documents for FIM; two independent
    md5-derived cut points split the token stream into prefix / middle /
    suffix so the trainer can emit PSM order (prefix, suffix, middle) with
    sentinel tokens.  Documents not selected pass through as
    ``mode='plain'`` with the whole text in ``prefix`` — the mixed
    plain+FIM shard the paper trains on.

    The three segments are emitted as separate columns (not one
    pre-spliced string) so the splice-back invariant is checkable:
    tokens(prefix) ++ tokens(middle) ++ tokens(suffix) == tokens(text)
    for EVERY row, both modes — FIM must be lossless or the objective
    leaks/starves tokens.

    100 TB shape: pure JVM per row — one split, two md5 cuts, three
    array slices inside codegen; zero python, zero shuffle.  Cut points
    are uniform over 0..n (inclusive), so empty segments are legal (the
    paper keeps them; the sentinels alone carry the signal).
    """
    from pyspark.sql import functions as F

    if not 0 <= fim_pct <= 100:
        raise ValueError("fim_pct must be in [0, 100]")
    did = F.col(id_col).cast("string")
    toks = F.filter(F.split(F.trim(F.col(text_col)), r"\s+"), lambda t: t != "")
    n = F.coalesce(F.size(toks), F.lit(0)).cast("long")

    def cut(tag):
        h = F.conv(
            F.substring(F.md5(F.concat(did, F.lit(f":fim:{tag}"))), 1, 8), 16, 10
        ).cast("long")
        return h % (n + 1)

    lo = F.least(cut("a"), cut("b"))
    hi = F.greatest(cut("a"), cut("b"))
    gate = (
        F.conv(
            F.substring(F.md5(F.concat(did, F.lit(":fim:g"))), 1, 4), 16, 10
        ).cast("long")
        % 100
    ) < fim_pct
    join = lambda arr: F.coalesce(F.array_join(arr, " "), F.lit(""))
    prefix = join(F.slice(toks, 1, lo.cast("int")))
    middle = join(F.slice(toks, (lo + 1).cast("int"), (hi - lo).cast("int")))
    suffix = join(F.slice(toks, (hi + 1).cast("int"), (n - hi).cast("int")))
    full = join(toks)
    return docs.select(
        id_col,
        F.when(gate, F.lit("fim")).otherwise(F.lit("plain")).alias("mode"),
        F.when(gate, prefix).otherwise(full).alias("prefix"),
        F.when(gate, middle).otherwise(F.lit("")).alias("middle"),
        F.when(gate, suffix).otherwise(F.lit("")).alias("suffix"),
        F.when(gate, lo).otherwise(n).cast("long").alias("n_prefix"),
        F.when(gate, hi - lo).otherwise(F.lit(0)).cast("long").alias("n_middle"),
        F.when(gate, n - hi).otherwise(F.lit(0)).cast("long").alias("n_suffix"),
    )
