"""Streaming corpus → KG: continuous triple ingestion.

The batch pipeline (plans/kg_pipeline.py) re-expressed as a Structured
Streaming job: a file-source stream of document parquet (the shape in which
a crawler lands new WARC batches) runs the SAME fused E1-E3 kernel per
micro-batch and appends run-tagged triples + lineage manifest rows — so
batch resume and streaming ingestion share one output contract, and a
stalled stream can be resumed by the BATCH pipeline against the same
manifest (and vice versa).

Architecture split (the standard lambda shape for KG maintenance):
* hot path (here): append-only extract→chunk→triples, zero shuffles, one
  python stage per batch — keeps up with arrival rate;
* cold path (batch, periodic): `recanonicalize_output` — global alias
  re-election + id refresh over everything appended so far.  Linking and
  canonicalization need global state, so they do NOT run per micro-batch.

Exactly-once contract: run_id = ``stream-<batch_id>`` is deterministic
across a crashed attempt and its replay (same checkpointed batch → same
batch_id → same input files), so the sink must be IDEMPOTENT per batch —
a plain append would double the batch's triples on replay, and because the
replayed rows carry a manifest-valid run_id the compaction's orphan-drop
semi-join would keep both copies.  The sink therefore brackets each batch
with two O(1) marker files (``_stream_intents/<run_id>`` before the first
append, ``_stream_commits/<run_id>`` after the last):

* commit marker present  → the whole batch landed; replay returns at once;
* intent marker present  → a prior attempt crashed mid-batch; each append
  job is atomic (FileOutputCommitter publishes all files at job commit or
  none), so the replay probes triples/manifest for the run_id (a pushed-down
  point lookup, run_id is constant per file so row-group stats prune the
  scan) and re-appends only the missing table(s) — the fused kernel is
  deterministic, so the recomputed rows are byte-equal to the crashed
  attempt's;
* neither               → normal first attempt.

Underscore-prefixed marker dirs are invisible to Spark's parquet reader.
Local-FS markers here; on HDFS/S3 the same two touches go through the
Hadoop FileSystem API (create-with-overwrite is atomic on both).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

DOCS_SCHEMA = "url string, warc_ts timestamp, html binary, text string, lang string"


# shared marker protocol (pid-carrying touch, heartbeats, pid-liveness
# stale detection) lives in operators/markers.py — the batch pipeline's E7
# writer and compaction speak the same dialect
from ..operators.markers import heartbeat as _heartbeat
from ..operators.markers import touch as _touch
from ..operators.markers import wait_for_compaction as _wait_for_compaction


def _run_landed(spark: SparkSession, table_path: str, run_id: str) -> bool:
    """True when `table_path` already holds rows of `run_id` (atomic-append
    probe for crash replay; pushed-down point lookup)."""
    if not os.path.exists(table_path):
        return False
    probe = spark.read.parquet(table_path).filter(F.col("run_id") == run_id).limit(1)
    return bool(probe.take(1))


def make_stream_sink(output_dir: str, dedup: bool = False, near_dedup: bool = False):
    """Build the idempotent foreachBatch sink (exposed for direct testing:
    calling the sink twice with the same batch_id must leave the output
    byte-identical to calling it once).

    If the batch carries a ``session_id`` column (the sessionized ingest path,
    `start_kg_stream_sessionized`), every triple row is tagged with its doc's
    session id — session-scoped provenance riding the same exactly-once
    contract.

    ``dedup=True`` adds crawler-style CONTENT DEDUP at ingest: each batch is
    cut down to first-seen html digests (intra-batch min-url election + an
    anti-join against the accumulated ``digests/`` store — the O(delta)
    discipline of operators/dedup.py::incremental_exact_dedup; the
    historical corpus is never rescanned).  Duplicate urls still land in the
    manifest (rows_out = 0), so resume treats them as processed; the digests
    append rides the same intent/commit marker protocol (run_id-tagged, so a
    crash replay probes-and-skips like triples/manifest).

    ``near_dedup=True`` adds streaming NEAR-dup DETECTION: each batch runs one
    `incremental_minhash_step` against the accumulated LSH index
    (``lsh_bands/`` + ``lsh_sigs/``, run_id-tagged append-only parquet) and
    appends the verified pairs to ``near_pairs/``.  Detection only — electing
    keepers needs global alias state, so acting on the pairs belongs to the
    cold compaction path, same split as linking/canonicalization.  Crash
    safety: the store reads EXCLUDE the current run_id, so a partial replay
    recomputes the byte-identical delta regardless of which appends landed,
    and the step's own replay guard (ids already in the store drop out of the
    delta) makes a re-delivered batch a no-op for both index rows and pairs.
    Fingerprints are taken over the EXTRACTED text (E1); docs with no html or
    an empty extraction cannot be fingerprinted and are excluded from the
    index, never from triples/manifest."""
    triples_path = os.path.join(output_dir, "triples")
    manifest_path = os.path.join(output_dir, "manifest")
    digests_path = os.path.join(output_dir, "digests")
    lsh_bands_path = os.path.join(output_dir, "lsh_bands")
    lsh_sigs_path = os.path.join(output_dir, "lsh_sigs")
    near_pairs_path = os.path.join(output_dir, "near_pairs")
    commits_dir = os.path.join(output_dir, "_stream_commits")
    intents_dir = os.path.join(output_dir, "_stream_intents")

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        from ..functions.udfs import docs_to_triples_fused
        from ..operators.resume import lineage_manifest

        spark = batch_df.sparkSession
        run_id = f"stream-{batch_id}"
        commit_marker = os.path.join(commits_dir, run_id)
        if os.path.exists(commit_marker):
            return  # replay of a fully-committed batch
        intent_marker = os.path.join(intents_dir, run_id)
        partial_replay = os.path.exists(intent_marker)
        _touch(intent_marker)
        # Dekker-style mutual exclusion with compaction
        # (plans/kg_pipeline.py::recanonicalize_output): each side publishes
        # its own flag FIRST (our intent marker above / compaction's lock
        # file), THEN reads the other's.  Whatever the interleaving, at
        # least one side sees the other: compaction that scanned intents
        # before ours landed has its lock visible here, so we WAIT; if our
        # intent landed first, compaction's scan sees it and refuses.
        # Without this, a batch starting mid-rewrite could append + commit
        # and then have its rows silently clobbered by the directory swap —
        # with the commit marker suppressing the replay that would have
        # healed it.
        _wait_for_compaction(os.path.join(output_dir, "_compaction_lock"))

        to_extract = batch_df
        new_digests = None
        if dedup:
            hashed = batch_df.withColumn("_digest", F.md5(F.col("html")))
            from pyspark.sql.window import Window

            keep = F.min("url").over(Window.partitionBy("_digest"))
            intra = hashed.withColumn("_keep", keep).filter(F.col("url") == F.col("_keep"))
            if os.path.exists(digests_path):
                # exclude OUR OWN run_id (like the LSH stores below): a
                # crashed attempt's digests must not mark this replay's docs
                # as already-seen — with stale-intent orphan-dropping
                # (recanonicalize_output) the crashed run's TRIPLES may be
                # gone, and an own-run digest hit would make the replay
                # re-append nothing while the manifest records the urls as
                # processed: silent permanent loss.  Null-safe exclusion
                # (<=>): plain != yields NULL for a NULL-tagged legacy
                # digest row, silently dropping it from the store instead
                # of treating it as another run's digest
                store = spark.read.parquet(digests_path).filter(
                    ~(F.col("run_id").eqNullSafe(F.lit(run_id)))
                ).select(F.col("digest").alias("_digest"))
                fresh = intra.join(store, "_digest", "left_anti")
            else:
                fresh = intra
            fresh = fresh.persist()
            to_extract = fresh.drop("_digest", "_keep")
            new_digests = fresh.select(
                F.col("_digest").alias("digest"), F.col("url").alias("keep_url")
            ).withColumn("run_id", F.lit(run_id))

        out = docs_to_triples_fused(to_extract).withColumn("run_id", F.lit(run_id))
        if "session_id" in batch_df.columns:
            # per-batch url→session map, ONE row per url: a url re-fetched
            # within the batch across a session boundary has two doc rows
            # (two session ids), but its triple rows are url-keyed and
            # indistinguishable per fetch — an ambiguous join would fan each
            # triple out to every session (row multiplication).  Provenance
            # resolves to the LATEST fetch's session (max_by ep); tiny map →
            # broadcast.
            smap = batch_df.groupBy("url").agg(
                F.max_by("session_id", "ep").alias("session_id")
            )
            out = out.join(F.broadcast(smap), "url", "left")
        out = out.persist()
        _heartbeat(intent_marker)  # long batch ≠ crashed batch: refresh
        if not (partial_replay and _run_landed(spark, triples_path, run_id)):
            out.write.mode("append").parquet(triples_path)
        if new_digests is not None and not (
            partial_replay and _run_landed(spark, digests_path, run_id)
        ):
            new_digests.write.mode("append").parquet(digests_path)
        _heartbeat(intent_marker)
        if not (partial_replay and _run_landed(spark, manifest_path, run_id)):
            manifest = lineage_manifest(out, run_id=run_id)
            no_triple_urls = (
                batch_df.select("url").distinct()
                .join(manifest.select("url"), "url", "left_anti")
                .withColumn("partition_id", F.lit(-1))
                .withColumn("rows_out", F.lit(0))
                .withColumn("run_id", F.lit(run_id))
                .withColumn("completed_ts", F.current_timestamp())
            )
            manifest.unionByName(no_triple_urls).write.mode("append").parquet(manifest_path)
        if near_dedup:
            from ..operators.dedup import incremental_minhash_step
            from ..plans.kg_pipeline import extract_text

            store_b = store_s = None
            if os.path.exists(lsh_sigs_path):
                # bands are appended BEFORE sigs, so sigs existing implies
                # bands exist; excluding this run_id makes the delta (and
                # therefore the pairs) identical across a partial replay
                store_s = (
                    spark.read.parquet(lsh_sigs_path)
                    .filter(~(F.col("run_id").eqNullSafe(F.lit(run_id))))
                    .select("id", "sig")
                )
                store_b = (
                    spark.read.parquet(lsh_bands_path)
                    .filter(~(F.col("run_id").eqNullSafe(F.lit(run_id))))
                    .select("id", "band", "bhash")
                )
            # fingerprint the EXTRACTED text (E1), the same surface the batch
            # near-dup operators see — the raw `text` column is unpopulated
            # until extraction, and markup noise would dominate html shingles
            fingerprintable = extract_text(
                batch_df.filter(F.col("html").isNotNull())
            ).filter(F.length("text") > 0)
            pairs, d_bands, d_sigs = incremental_minhash_step(
                fingerprintable.select("url", "text"),
                store_b,
                store_s,
                content_col="text",
                id_col="url",
            )
            _heartbeat(intent_marker)
            if not (partial_replay and _run_landed(spark, lsh_bands_path, run_id)):
                d_bands.withColumn("run_id", F.lit(run_id)).write.mode(
                    "append"
                ).parquet(lsh_bands_path)
            if not (partial_replay and _run_landed(spark, lsh_sigs_path, run_id)):
                d_sigs.withColumn("run_id", F.lit(run_id)).write.mode(
                    "append"
                ).parquet(lsh_sigs_path)
            if not (partial_replay and _run_landed(spark, near_pairs_path, run_id)):
                pairs.withColumn("run_id", F.lit(run_id)).write.mode(
                    "append"
                ).parquet(near_pairs_path)
        out.unpersist()
        if new_digests is not None:
            fresh.unpersist()
        _touch(commit_marker)
        os.remove(intent_marker)

    return sink


def start_kg_stream_neardup(
    spark: SparkSession,
    source_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    max_files_per_trigger: int = 16,
    trigger_available_now: bool = True,
):
    """KG stream with streaming near-dup detection: triples/manifest as
    usual, plus an append-only MinHash-LSH index (``lsh_bands/`` +
    ``lsh_sigs/``) and verified near-dup pairs (``near_pairs/``) maintained
    per micro-batch (see make_stream_sink docstring for the store/replay
    contract)."""
    stream = (
        spark.readStream.schema(DOCS_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(source_dir)
    )
    writer = (
        stream.writeStream.foreachBatch(make_stream_sink(output_dir, near_dedup=True))
        .option("checkpointLocation", checkpoint_dir)
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def start_kg_stream_deduped(
    spark: SparkSession,
    source_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    max_files_per_trigger: int = 16,
    trigger_available_now: bool = True,
):
    """Content-deduped ingest: the plain KG stream with ``dedup=True`` —
    first-seen html digests produce triples, later copies only manifest rows
    (see make_stream_sink docstring for the store/marker contract)."""
    stream = (
        spark.readStream.schema(DOCS_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(source_dir)
    )
    writer = (
        stream.writeStream.foreachBatch(make_stream_sink(output_dir, dedup=True))
        .option("checkpointLocation", checkpoint_dir)
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def start_kg_stream(
    spark: SparkSession,
    source_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    max_files_per_trigger: int = 16,
    trigger_available_now: bool = True,
):
    """Stream doc parquet files from `source_dir` into the KG output layout
    (`triples/` + `manifest/`, run_id = ``stream-<batch_id>``).  Exactly-once
    per micro-batch via foreachBatch + checkpoint + the idempotent marker
    protocol in `make_stream_sink` (module docstring has the crash matrix)."""
    stream = (
        spark.readStream.schema(DOCS_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(source_dir)
    )
    writer = (
        stream.writeStream.foreachBatch(make_stream_sink(output_dir))
        .option("checkpointLocation", checkpoint_dir)
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


# --- sessionized ingest: session-scoped provenance on triples -----------------------

SESSIONIZED_DOC_SCHEMA = (
    "url string, warc_ts timestamp, html binary, text string, lang string, "
    "host string, ep long, session_id string"
)
_DOC_STATE_SCHEMA = "session_start long, last_ts long"


def make_doc_sessionizer(gap_seconds: int):
    """applyInPandasWithState fn: label each incoming doc with the crawl
    session open for its host at processing time — ``session_id =
    <host>@<session_start>``, a new session starting when the gap since the
    host's previous doc exceeds ``gap_seconds``.  State is the minimal
    (session_start, last_ts) pair per host and crosses micro-batches, so a
    session spanning many batches keeps ONE id.  Enrichment, not
    aggregation: rows pass through (sorted by ep within the batch) with the
    id appended — the closed-session aggregate remains stateful.py's job.

    Contract with the batch twin (operators/temporal.py::
    assign_crawl_sessions): over per-host ts-ordered arrivals the two assign
    identical ids (test-pinned).  An out-of-order CROSS-batch arrival joins
    the open session (its id stays the session's first-seen ts) — the
    streaming-only approximation, same trade the stateful sessionizer makes."""
    import pandas as pd

    def fn(key, pdfs, state):
        if state.exists:
            start, last = state.get
        else:
            start, last = None, None
        frames = [pdf for pdf in pdfs if len(pdf)]
        if not frames:
            return
        rows = pd.concat(frames).sort_values("ep", kind="mergesort")
        starts = []
        for t in (int(x) for x in rows["ep"]):
            if last is None or t - last > gap_seconds:
                start = t
            last = t if last is None else max(last, t)
            starts.append(start)
        state.update((start, last))
        rows = rows.assign(session_id=[f"{key[0]}@{s}" for s in starts])
        yield rows

    return fn


def sessionize_docs_stream(docs: DataFrame, gap_seconds: int) -> DataFrame:
    """Streaming docs (url, warc_ts, html, text, lang) → same rows + (host,
    ep, session_id).  One shuffle per micro-batch on host (the state-store
    partitioning); state is O(active hosts) × two longs."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    prepared = docs.withColumn(
        "host", F.regexp_extract("url", r"https?://([^/]+)", 1)
    ).withColumn("ep", F.unix_timestamp("warc_ts").cast("long"))
    return prepared.groupBy("host").applyInPandasWithState(
        make_doc_sessionizer(gap_seconds),
        outputStructType=SESSIONIZED_DOC_SCHEMA,
        stateStructType=_DOC_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def start_kg_stream_sessionized(
    spark: SparkSession,
    source_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    gap_seconds: int = 3600,
    max_files_per_trigger: int = 16,
    trigger_available_now: bool = True,
):
    """The sessionized ingest composition: file stream → per-host stateful
    session labeling → fused E1-E3 triples CARRYING session_id → the
    idempotent run-tagged append.  The stateful operator is load-bearing on
    the ingest path (every triple's provenance includes the crawl session
    that produced it), and the output contract stays the batch-compatible
    (triples/ + manifest/) layout plus the session_id column."""
    stream = (
        spark.readStream.schema(DOCS_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(source_dir)
    )
    enriched = sessionize_docs_stream(stream, gap_seconds)
    writer = (
        enriched.writeStream.foreachBatch(make_stream_sink(output_dir))
        .option("checkpointLocation", checkpoint_dir)
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
