"""Custom stateful streaming operator: gap-based sessionization via
``applyInPandasWithState``.

New component (the reference has no stateful stream processing; this is the
idiomatic-Spark custom-operator path for semantics the built-in windowed
aggregations can't express — a session ends on INACTIVITY GAP, not on a
fixed window boundary).

Semantics: per key, events are folded in timestamp order; a gap
> ``gap_seconds`` between consecutive events closes the open session, which
is emitted as ``(key, session_start, session_end, n_events)``.  The open
session survives in the group state ACROSS micro-batches (checkpointed), so
a session spanning many batches closes exactly once, when its closing gap
finally arrives.  Open sessions also flush on processing-time timeout
(``flush_timeout_ms``) so the last session of an idle key is not held
forever.

Scale notes: state is O(active keys) × a 4-field tuple — the minimum for gap
sessionization; each micro-batch shuffles only that batch's rows on the key
(the same hash partitioning every batch, so state stays co-located with its
key's partition — Spark's state store contract).
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

SESSION_SCHEMA = StructType(
    [
        StructField("key", StringType()),
        StructField("session_start", LongType()),
        StructField("session_end", LongType()),
        StructField("n_events", IntegerType()),
    ]
)

STATE_SCHEMA = StructType(
    [
        StructField("session_start", LongType()),
        StructField("last_ts", LongType()),
        StructField("n_events", IntegerType()),
    ]
)


def make_sessionizer(gap_seconds: int, flush_timeout_ms: int = 30_000):
    """Build the applyInPandasWithState function (closure carries only plain
    ints — picklable, no driver references)."""

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        k = key[0]
        closed: list[tuple[Any, int, int, int]] = []
        if state.hasTimedOut:
            # idle key: flush the open session and drop the state
            start, last, n = state.get
            closed.append((k, start, last, n))
            state.remove()
        else:
            if state.exists:
                start, last, n = state.get
            else:
                start, last, n = None, None, 0
            ts_all: list[int] = []
            for pdf in pdfs:
                ts_all.extend(int(t) for t in pdf["ts_epoch"])
            for t in sorted(ts_all):
                if last is not None and t - last > gap_seconds:
                    closed.append((k, start, last, n))
                    start, n = t, 0
                if start is None:
                    start = t
                n += 1
                # clamp monotonically: a CROSS-BATCH late event (t ≤ last —
                # sorting only orders within the batch) merges into the open
                # session instead of dragging its end time backwards, which
                # would emit end < start and spuriously split the session on
                # the next gap test.  start follows min() so the session span
                # still covers the late event.
                last = t if last is None else max(last, t)
                start = min(start, t)
            state.update((start, last, n))
            state.setTimeoutDuration(flush_timeout_ms)
        if closed:
            yield pd.DataFrame(
                closed, columns=["key", "session_start", "session_end", "n_events"]
            )

    return fn


def sessionize_stream(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts_epoch",
    gap_seconds: int = 3600,
    flush_timeout_ms: int = 30_000,
) -> DataFrame:
    """events (streaming DF with key + epoch-seconds ts) → closed-session
    stream.  Append output mode: a session row is emitted exactly once, when
    it closes."""
    from pyspark.sql import functions as F

    prepared = events.select(
        F.col(key_col).cast("string").alias("key"), F.col(ts_col).cast("long").alias("ts_epoch")
    )
    return prepared.groupBy("key").applyInPandasWithState(
        make_sessionizer(gap_seconds, flush_timeout_ms),
        outputStructType=SESSION_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )


DEDUP_SCHEMA = StructType(
    [
        StructField("digest", StringType()),
        StructField("url", StringType()),
        StructField("ts_epoch", LongType()),
    ]
)

DEDUP_STATE_SCHEMA = StructType([StructField("seen", IntegerType())])


def make_first_seen_dedup():
    """applyInPandasWithState function for exact streaming dedup: per
    content digest, the FIRST occurrence ever seen wins (deterministic
    (ts, url) election inside the arrival batch) and every later arrival —
    same batch or any later micro-batch — is suppressed.  State is one
    marker int per digest."""

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        digest = key[0]
        rows: list[tuple[int, str]] = []
        for pdf in pdfs:
            rows.extend(
                (int(t), str(u)) for t, u in zip(pdf["ts_epoch"], pdf["url"])
            )
        if not rows:
            # data-less (timeout) invocation: touch NOTHING — marking the
            # digest seen here would suppress its real first occurrence
            return
        if state.exists:
            # duplicate of an earlier batch's winner: suppress
            return
        ts, url = min(rows)
        state.update((1,))
        yield pd.DataFrame([(digest, url, ts)], columns=["digest", "url", "ts_epoch"])

    return fn


def dedup_stream_first_seen(
    docs: DataFrame,
    url_col: str = "url",
    ts_col: str = "ts_epoch",
    text_col: str = "text",
) -> DataFrame:
    """Streaming exact dedup by content digest — the batch ``dedup_exact``
    keeper election carried across micro-batches: the first-seen snapshot
    of each distinct text survives, replays and re-crawls are dropped at
    ingest, and the kept stream is append-mode (each winner emitted exactly
    once, in the batch where its digest first appears).

    State is O(distinct digests) × one int — the honest cost of EXACT
    streaming dedup; at 100 TB scope the state store (RocksDB) holds the
    digest set and the same md5-keyed hash partitioning every batch keeps
    state co-located, or bound memory by composing a bloom/TTL pre-filter
    upstream (operators/dedup.py bloom_prefilter) and accepting its false
    negatives."""
    from pyspark.sql import functions as F

    prepared = docs.select(
        F.md5(F.col(text_col)).alias("digest"),
        F.col(url_col).cast("string").alias("url"),
        F.col(ts_col).cast("long").alias("ts_epoch"),
    )
    return prepared.groupBy("digest").applyInPandasWithState(
        make_first_seen_dedup(),
        outputStructType=DEDUP_SCHEMA,
        stateStructType=DEDUP_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
