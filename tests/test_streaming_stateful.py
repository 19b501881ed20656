"""Streaming gates: custom stateful sessionization (applyInPandasWithState),
socket push-source ingest, and watermarked windowed aggregation.

Each test drives a REAL StreamingQuery (file or socket source) — not the
batch twin — so state crossing micro-batches, checkpointing, and watermark
finalization are what's actually exercised.
"""

from __future__ import annotations

import json
import os
import socket
import threading
import time

import pytest
from pyspark.sql import functions as F


def _write_json(path: str, rows: list[dict], mtime: int | None = None) -> None:
    with open(path, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    if mtime is not None:
        # the file source orders batches by modification time; pin it so
        # "batch 0 then batch 1" is deterministic (same-ms writes tie)
        os.utime(path, (mtime, mtime))


def test_stateful_sessionize_state_survives_batches(spark, tmp_path):
    """A session opened in batch 0 must close in batch 1 (gap arrives there)
    — exactly once, with counts accumulated across both micro-batches."""
    from aiwhispr_spark.streaming.stateful import sessionize_stream

    src = tmp_path / "src"
    src.mkdir()
    # batch 0: u1 events at t=0,100,200 (one open session)
    _write_json(
        str(src / "0.json"),
        [{"user_id": "u1", "ts_epoch": t} for t in (0, 100, 200)],
        mtime=1_000_000,
    )
    # batch 1: u1 jumps to t=10000 (gap 9800 > 3600 → closes session 0-200);
    # u2 appears (stays open, must NOT be emitted)
    _write_json(
        str(src / "1.json"),
        [{"user_id": "u1", "ts_epoch": 10000}, {"user_id": "u2", "ts_epoch": 5}],
        mtime=2_000_000,
    )
    stream = (
        spark.readStream.schema("user_id string, ts_epoch long")
        .option("maxFilesPerTrigger", 1)
        .json(str(src))
    )
    # flush timeout far beyond test wall-clock: only GAP-closed sessions emit
    sessions = sessionize_stream(
        stream, "user_id", "ts_epoch", gap_seconds=3600, flush_timeout_ms=3_600_000_000
    )
    q = (
        sessions.writeStream.format("memory")
        .queryName("sess_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = [r.asDict() for r in spark.sql("SELECT * FROM sess_out").collect()]
    assert rows == [
        {"key": "u1", "session_start": 0, "session_end": 200, "n_events": 3}
    ]


def test_stateful_sessionize_multiple_gaps_in_one_batch(spark, tmp_path):
    from aiwhispr_spark.streaming.stateful import sessionize_stream

    src = tmp_path / "src"
    src.mkdir()
    _write_json(
        str(src / "0.json"),
        [{"user_id": "a", "ts_epoch": t} for t in (0, 10, 5000, 5020, 99000, 99001)],
    )
    stream = spark.readStream.schema("user_id string, ts_epoch long").json(str(src))
    sessions = sessionize_stream(
        stream, "user_id", "ts_epoch", gap_seconds=1000, flush_timeout_ms=3_600_000_000
    )
    q = (
        sessions.writeStream.format("memory")
        .queryName("sess_gaps")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = sorted(
        (r["session_start"], r["session_end"], r["n_events"])
        for r in spark.sql("SELECT * FROM sess_gaps").collect()
    )
    # two CLOSED sessions; the (99000, 99001) session stays open in state
    assert rows == [(0, 10, 2), (5000, 5020, 2)]


def test_stateful_sessionize_cross_batch_late_event_merges(spark, tmp_path):
    """A late event in a later micro-batch (t ≤ state's last) must merge into
    the open session — never drag its end time backwards (which would emit
    end < start and split the session on the next gap test)."""
    from aiwhispr_spark.streaming.stateful import sessionize_stream

    src = tmp_path / "src"
    src.mkdir()
    _write_json(str(src / "0.json"), [{"user_id": "u", "ts_epoch": 1000}], mtime=1_000_000)
    # late event (400 < 1000) arrives in batch 1
    _write_json(str(src / "1.json"), [{"user_id": "u", "ts_epoch": 400}], mtime=2_000_000)
    # batch 2: gap vs the CLAMPED last (1000) → closes one merged session
    _write_json(str(src / "2.json"), [{"user_id": "u", "ts_epoch": 9000}], mtime=3_000_000)
    stream = (
        spark.readStream.schema("user_id string, ts_epoch long")
        .option("maxFilesPerTrigger", 1)
        .json(str(src))
    )
    sessions = sessionize_stream(
        stream, "user_id", "ts_epoch", gap_seconds=3600, flush_timeout_ms=3_600_000_000
    )
    q = (
        sessions.writeStream.format("memory")
        .queryName("sess_late")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = [r.asDict() for r in spark.sql("SELECT * FROM sess_late").collect()]
    assert rows == [
        {"key": "u", "session_start": 400, "session_end": 1000, "n_events": 2}
    ]


def test_socket_ingest_stream(spark, tmp_path):
    """The push-queue stand-in: JSON lines over TCP → validate→embed→parquet."""
    from aiwhispr_spark.streaming.ingest import start_ingest_stream_socket

    payloads = [
        {"content_site_name": "s", "src_path": "p", "content_path": f"c{i}",
         "text_chunk": "This is an English sentence. And another one here.",
         "chunk_no": None, "last_edit_date": None, "tags": "", "title": f"t{i}"}
        for i in range(5)
    ]
    srv = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
    srv.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
    srv.bind(("127.0.0.1", 0))
    srv.listen(1)
    port = srv.getsockname()[1]
    stop = threading.Event()

    def serve():
        conn, _ = srv.accept()
        with conn:
            conn.sendall(("".join(json.dumps(p) + "\n" for p in payloads)).encode())
            stop.wait(60)  # keep the connection open while the stream drains

    t = threading.Thread(target=serve, daemon=True)
    t.start()
    sink = str(tmp_path / "sink")
    q = start_ingest_stream_socket(
        spark, "127.0.0.1", port, sink, str(tmp_path / "ck")
    )
    try:
        deadline = time.time() + 90
        n = 0
        while time.time() < deadline:
            if os.path.isdir(sink):
                try:
                    n = spark.read.parquet(sink).count()
                except Exception:
                    n = 0
                if n >= 5:
                    break
            time.sleep(1)
        assert n >= 5
        out = spark.read.parquet(sink)
        row = out.filter(F.col("content_path") == "c0").first()
        assert row["chunk_no"] == 1  # default applied
        assert len(row["embedding"]) > 0  # embed stage ran
    finally:
        stop.set()
        q.stop()
        srv.close()


def test_windowed_counts_watermark_drops_late_rows(spark, tmp_path):
    """Append-mode windows emit exactly once when the watermark passes their
    end; a row arriving after its window was finalized+evicted is dropped —
    no double emission, no count bump.  (A late row whose window state is
    still live DOES aggregate — the watermark is a drop guarantee only after
    eviction — hence the three-batch choreography here: finalize in batch 1,
    late arrival in batch 2.)"""
    from aiwhispr_spark.streaming.windows import windowed_event_counts

    src = tmp_path / "src"
    src.mkdir()
    # batch 0: one event in [00:00:00,00:00:10) + one at 00:01:00 → watermark
    # after batch 0 = 00:00:50
    _write_json(
        str(src / "0.json"),
        [
            {"ts": "2024-01-01 00:00:05", "event_type": "click"},
            {"ts": "2024-01-01 00:01:00", "event_type": "click"},
        ],
        mtime=1_000_000,
    )
    # batch 1: watermark 00:00:50 now in effect → window [00:00,00:10)
    # finalizes with count 1; this batch's event advances watermark to 00:01:50
    _write_json(
        str(src / "1.json"), [{"ts": "2024-01-01 00:02:00", "event_type": "click"}],
        mtime=2_000_000,
    )
    # batch 2: a LATE row for the already-evicted first window → dropped
    _write_json(
        str(src / "2.json"), [{"ts": "2024-01-01 00:00:07", "event_type": "click"}],
        mtime=3_000_000,
    )
    stream = (
        spark.readStream.schema("ts timestamp, event_type string")
        .option("maxFilesPerTrigger", 1)
        .json(str(src))
    )
    counts = windowed_event_counts(
        stream, "ts", "event_type", window="10 seconds", watermark="10 seconds"
    )
    q = (
        counts.writeStream.format("memory")
        .queryName("win_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = [r.asDict() for r in spark.sql("SELECT * FROM win_out").collect()]
    finalized = sorted((str(r["window_start"]), r["n"]) for r in rows)
    # win[00:00) finalized ONCE with the on-time count (late row dropped);
    # win[01:00) finalized in batch 2; win[02:00) still open → absent
    assert finalized == [
        ("2024-01-01 00:00:00", 1),
        ("2024-01-01 00:01:00", 1),
    ]


def test_kg_stream_matches_batch_pipeline(spark, tmp_path):
    """Streaming corpus→KG must produce EXACTLY the batch pipeline's triple
    set over the same documents, with per-batch run_ids and a manifest
    covering every url (incl. docs yielding no triples)."""
    from aiwhispr_spark.functions.udfs import docs_to_triples_fused
    from aiwhispr_spark.sources.synthetic import write_corpus_parquet
    from aiwhispr_spark.streaming.kg_stream import start_kg_stream

    import glob as globmod
    import shutil

    src = tmp_path / "src"
    src.mkdir()
    # two arrival batches of the same seeded corpus, each as ONE parquet FILE
    # (the file source lists plain files; pin mtimes for batch order)
    corpus = str(tmp_path / "corpus.parquet")
    write_corpus_parquet(corpus, n_docs=40)
    full = spark.read.parquet(corpus)

    def one_file(df, name, mtime):
        tmp = str(tmp_path / f"w_{name}")
        df.coalesce(1).write.mode("overwrite").parquet(tmp)
        part = globmod.glob(tmp + "/part-*.parquet")[0]
        dest = str(src / name)
        shutil.copy(part, dest)
        os.utime(dest, (mtime, mtime))

    one_file(full.filter(F.col("url").rlike("/page/[0-1]?[0-9]$")), "a.parquet", 1_000_000)
    one_file(full.filter(~F.col("url").rlike("/page/[0-1]?[0-9]$")), "b.parquet", 2_000_000)

    out = str(tmp_path / "kg")
    q = start_kg_stream(
        spark, str(src), out, str(tmp_path / "ck"), max_files_per_trigger=1
    )
    q.awaitTermination(180)

    streamed = spark.read.parquet(out + "/triples")
    batch = docs_to_triples_fused(full)
    key = ["url", "chunk_no", "subj", "pred", "obj"]
    assert streamed.select(key).exceptAll(batch.select(key)).count() == 0
    assert batch.select(key).exceptAll(streamed.select(key)).count() == 0
    runs = {r["run_id"] for r in streamed.select("run_id").distinct().collect()}
    assert len(runs) == 2  # one run tag per micro-batch
    manifest = spark.read.parquet(out + "/manifest")
    assert manifest.select("url").distinct().count() == 40  # every doc covered


def test_kafka_path_requires_package(spark, tmp_path):
    """The Kafka reader is the documented production path; without the
    kafka-sql package it must fail FAST at load() with the standard
    data-source error (not silently no-op)."""
    from aiwhispr_spark.streaming.ingest import start_ingest_stream_kafka

    with pytest.raises(Exception) as ei:
        start_ingest_stream_kafka(
            spark, "localhost:9092", "t", str(tmp_path / "s"), str(tmp_path / "c")
        )
    assert "kafka" in str(ei.value).lower()


def test_kg_stream_sink_replay_idempotent(spark, tmp_path, monkeypatch):
    """Crash-replay matrix for the streaming sink (ADVICE r2): replaying a
    batch — fully committed, crashed between triples and manifest, or crashed
    after manifest but before the commit marker — must leave the output
    identical to a single clean run (no duplicate triples, no duplicate
    manifest rows, run_id still manifest-valid)."""
    from aiwhispr_spark.sources.synthetic import write_corpus_parquet
    from aiwhispr_spark.streaming.kg_stream import make_stream_sink

    corpus = str(tmp_path / "corpus.parquet")
    write_corpus_parquet(corpus, n_docs=20)
    docs = spark.read.parquet(corpus)

    out = str(tmp_path / "kg")
    sink = make_stream_sink(out)

    # clean first run of batch 7
    sink(docs, 7)
    triples = spark.read.parquet(out + "/triples")
    manifest = spark.read.parquet(out + "/manifest")
    n_triples, n_manifest = triples.count(), manifest.count()
    assert n_triples > 0 and n_manifest >= 20

    # (a) full replay: checkpoint not yet committed, sink re-invoked
    sink(docs, 7)
    assert spark.read.parquet(out + "/triples").count() == n_triples
    assert spark.read.parquet(out + "/manifest").count() == n_manifest

    # (b) crash AFTER manifest append, BEFORE commit marker
    os.remove(os.path.join(out, "_stream_commits", "stream-7"))
    with open(os.path.join(out, "_stream_intents", "stream-7"), "w"):
        pass
    sink(docs, 7)
    assert spark.read.parquet(out + "/triples").count() == n_triples
    assert spark.read.parquet(out + "/manifest").count() == n_manifest
    assert os.path.exists(os.path.join(out, "_stream_commits", "stream-7"))

    # (c) crash BETWEEN triples append and manifest append (batch 8): make
    # lineage_manifest blow up mid-sink, then replay unpatched
    import aiwhispr_spark.operators.resume as resume_mod

    real_manifest = resume_mod.lineage_manifest

    def boom(*a, **k):
        raise RuntimeError("simulated crash before manifest append")

    monkeypatch.setattr(resume_mod, "lineage_manifest", boom)
    with pytest.raises(RuntimeError, match="simulated crash"):
        sink(docs, 8)
    monkeypatch.setattr(resume_mod, "lineage_manifest", real_manifest)
    t_after_crash = spark.read.parquet(out + "/triples").count()
    assert t_after_crash == 2 * n_triples  # batch 8's triples DID land
    sink(docs, 8)  # replay: must not re-append triples, must add manifest
    assert spark.read.parquet(out + "/triples").count() == t_after_crash
    m = spark.read.parquet(out + "/manifest")
    assert m.count() == 2 * n_manifest
    assert m.filter(F.col("run_id") == "stream-8").select("url").distinct().count() == 20


def test_sessionized_kg_stream_matches_batch_twin(spark, tmp_path):
    """VERDICT r2 #8: the stateful sessionizer is load-bearing on the ingest
    path — streamed triples carry session-scoped provenance IDENTICAL to the
    batch recomputation (assign_crawl_sessions + fused triples), with
    sessions crossing micro-batches (a host's later doc in a later batch
    keeps the session_start opened in an earlier batch's state)."""
    import glob as globmod
    import shutil

    from aiwhispr_spark.functions.udfs import docs_to_triples_fused
    from aiwhispr_spark.operators.temporal import assign_crawl_sessions
    from aiwhispr_spark.sources.synthetic import write_simple_corpus_parquet
    from aiwhispr_spark.streaming.kg_stream import start_kg_stream_sessionized

    corpus = str(tmp_path / "corpus.parquet")
    write_simple_corpus_parquet(corpus, n_docs=60)
    full = spark.read.parquet(corpus)
    page = F.regexp_extract("url", r"p/(\d+)$", 1).cast("int")

    src = tmp_path / "src"
    src.mkdir()

    def one_file(df, name, mtime):
        tmp = str(tmp_path / f"w_{name}")
        df.coalesce(1).write.mode("overwrite").parquet(tmp)
        part = globmod.glob(tmp + "/part-*.parquet")[0]
        dest = str(src / name)
        shutil.copy(part, dest)
        os.utime(dest, (mtime, mtime))

    # three arrival batches in warc_ts order: a host's 4-5 docs straddle them
    one_file(full.filter(page < 20), "a.parquet", 1_000_000)
    one_file(full.filter((page >= 20) & (page < 40)), "b.parquet", 2_000_000)
    one_file(full.filter(page >= 40), "c.parquet", 3_000_000)

    out = str(tmp_path / "kg")
    # per-host fetch spacing is 13·311 = 4043 s → gap_seconds=4043 keeps each
    # host's docs in ONE session (the ≤-gap merge branch), forcing the id to
    # survive in state across batches
    q = start_kg_stream_sessionized(
        spark, str(src), out, str(tmp_path / "ck"), gap_seconds=4043, max_files_per_trigger=1
    )
    q.awaitTermination(240)

    streamed = spark.read.parquet(out + "/triples")
    sessions = assign_crawl_sessions(
        full.select(
            "url",
            F.regexp_extract("url", r"https?://([^/]+)", 1).alias("host"),
            F.unix_timestamp("warc_ts").cast("long").alias("ep"),
        ),
        key_col="host",
        ts_col="ep",
        gap_seconds=4043,
        tiebreak_col="url",
    )
    batch_twin = docs_to_triples_fused(full).join(
        sessions.select("url", "session_id"), "url"
    )
    key = ["url", "chunk_no", "subj", "pred", "obj", "session_id"]
    assert streamed.select(key).exceptAll(batch_twin.select(key)).count() == 0
    assert batch_twin.select(key).exceptAll(streamed.select(key)).count() == 0
    # provenance really is session-scoped AND cross-batch: at least one
    # session's triples came from more than one micro-batch run
    spanning = (
        streamed.groupBy("session_id")
        .agg(F.countDistinct("run_id").alias("n_runs"))
        .filter(F.col("n_runs") >= 2)
    )
    assert spanning.count() > 0


def test_deduped_kg_stream_extracts_first_seen_only(spark, tmp_path):
    """Content dedup at ingest: a later batch re-delivering the same html
    under new urls must add NO triples (only manifest rows), the digest
    store must accumulate one row per distinct content, and a crash replay
    of the dedup batch must stay idempotent (digests ride the marker
    protocol)."""
    import glob as globmod
    import shutil

    from aiwhispr_spark.sources.synthetic import write_corpus_parquet
    from aiwhispr_spark.streaming.kg_stream import start_kg_stream_deduped

    corpus = str(tmp_path / "corpus.parquet")
    write_corpus_parquet(corpus, n_docs=20)
    full = spark.read.parquet(corpus)

    src = tmp_path / "src"
    src.mkdir()

    def one_file(df, name, mtime):
        tmp = str(tmp_path / f"w_{name}")
        df.coalesce(1).write.mode("overwrite").parquet(tmp)
        part = globmod.glob(tmp + "/part-*.parquet")[0]
        dest = str(src / name)
        shutil.copy(part, dest)
        os.utime(dest, (mtime, mtime))

    # batch a: the 20 originals; batch b: 10 of the same htmls under new urls
    dupes = full.filter(F.col("url").rlike("/page/[0-9]$")).withColumn(
        "url", F.concat(F.lit("https://mirror.example.org"), F.expr("substr(url, 9)"))
    )
    one_file(full, "a.parquet", 1_000_000)
    one_file(dupes, "b.parquet", 2_000_000)

    out = str(tmp_path / "kg")
    q = start_kg_stream_deduped(
        spark, str(src), out, str(tmp_path / "ck"), max_files_per_trigger=1
    )
    q.awaitTermination(180)

    triples = spark.read.parquet(out + "/triples")
    # every triple belongs to an ORIGINAL url — no mirror extraction ran
    assert triples.filter(F.col("url").contains("mirror")).count() == 0
    assert triples.filter(F.col("run_id") == "stream-1").count() == 0
    # manifest covers originals AND mirrors (mirrors as processed, 0 rows)
    manifest = spark.read.parquet(out + "/manifest")
    assert manifest.select("url").distinct().count() == 30
    digests = spark.read.parquet(out + "/digests")
    assert digests.count() == 20  # one per distinct content

    # crash-replay idempotence for the dedup batch: drop batch 1's commit
    # marker and re-run the sink directly
    from aiwhispr_spark.streaming.kg_stream import make_stream_sink

    os.remove(os.path.join(out, "_stream_commits", "stream-1"))
    with open(os.path.join(out, "_stream_intents", "stream-1"), "w"):
        pass
    make_stream_sink(out, dedup=True)(spark.read.parquet(str(src / "b.parquet")), 1)
    assert spark.read.parquet(out + "/digests").count() == 20
    assert spark.read.parquet(out + "/manifest").count() == manifest.count()
    assert spark.read.parquet(out + "/triples").count() == triples.count()


def test_neardup_kg_stream_pairs_match_batch_and_survive_replay(spark, tmp_path):
    """Streaming near-dup detection (make_stream_sink near_dedup=True): the
    accumulated near_pairs set equals the batch incremental two-step over the
    same extracted text, the LSH index holds exactly one sig row per
    fingerprintable url, and a crash replay of a batch adds no index rows and
    no duplicate pairs."""
    from aiwhispr_spark.operators.dedup import incremental_minhash_pairs
    from aiwhispr_spark.plans.kg_pipeline import extract_text
    from aiwhispr_spark.sources.synthetic import write_corpus_parquet
    from aiwhispr_spark.streaming.kg_stream import make_stream_sink

    corpus = str(tmp_path / "corpus.parquet")
    write_corpus_parquet(corpus, n_docs=24)
    docs = spark.read.parquet(corpus).orderBy("url")
    rows = docs.collect()
    half = len(rows) // 2
    # batch2 carries two mirrors of batch1 pages: one byte-identical html
    # copy (J=1, must always band-collide) and the second likewise (the
    # near-dup threshold itself is pinned in test_dedup_scale)
    dups = [
        r.asDict() | {"url": r["url"] + "#mirror"} for r in rows[:2] if r["html"]
    ]
    assert len(dups) == 2
    b1 = spark.createDataFrame(rows[:half], docs.schema)
    b2 = spark.createDataFrame(rows[half:] + [type(rows[0])(**d) for d in dups], docs.schema)

    out = str(tmp_path / "kg")
    sink = make_stream_sink(out, near_dedup=True)
    sink(b1, 0)
    sink(b2, 1)

    def pset(df):
        return {(r["a"], r["b"], r["n_match_i"]) for r in df.collect()}

    def fingerprintable(b):
        return (
            extract_text(b.filter(F.col("html").isNotNull()))
            .filter(F.length("text") > 0)
            .select(F.col("url").alias("doc_id"), "text")
        )

    streamed = pset(spark.read.parquet(out + "/near_pairs"))
    nn1, nn2 = fingerprintable(b1), fingerprintable(b2)
    p1, bands1, sigs1 = incremental_minhash_pairs(nn1, None, None)
    p2, _, _ = incremental_minhash_pairs(nn2, bands1, sigs1)
    assert streamed == pset(p1) | pset(p2)
    # the planted mirrors must actually be detected, at full agreement
    mirror_hits = {(a, b, n) for a, b, n in streamed if b.endswith("#mirror")}
    assert len(mirror_hits) >= 2
    assert all(n == 16 for _, _, n in mirror_hits)

    sigs = spark.read.parquet(out + "/lsh_sigs")
    n_sigs, n_pairs = sigs.count(), len(streamed)
    assert n_sigs == nn1.count() + nn2.count()
    assert sigs.select("id").distinct().count() == n_sigs

    # full replay (commit marker short-circuit)
    sink(b2, 1)
    # partial replay (crashed before commit marker)
    os.remove(os.path.join(out, "_stream_commits", "stream-1"))
    with open(os.path.join(out, "_stream_intents", "stream-1"), "w"):
        pass
    sink(b2, 1)
    assert spark.read.parquet(out + "/lsh_sigs").count() == n_sigs
    assert pset(spark.read.parquet(out + "/near_pairs")) == streamed
    assert spark.read.parquet(out + "/near_pairs").count() == n_pairs


def test_stream_dedup_first_seen_across_batches(spark, tmp_path):
    """Exact streaming dedup: per digest the (ts, url) minimum of its FIRST
    arrival batch wins; duplicates in the same batch and in LATER batches
    are suppressed by the state marker; streamed keeper set ≡ the batch
    dedup_exact election over the union of all batches."""
    from aiwhispr_spark.streaming.stateful import dedup_stream_first_seen

    src = tmp_path / "src"
    src.mkdir()
    # batch 0: two copies of text A (in-batch dup: ts tie-break elects u2
    # via min(ts)), one text B
    _write_json(
        str(src / "0.json"),
        [
            {"url": "u1", "ts_epoch": 50, "text": "A"},
            {"url": "u2", "ts_epoch": 10, "text": "A"},
            {"url": "u3", "ts_epoch": 20, "text": "B"},
        ],
        mtime=1_000_000,
    )
    # batch 1: text A re-crawled (must be suppressed by state), text C new
    _write_json(
        str(src / "1.json"),
        [
            {"url": "u4", "ts_epoch": 5, "text": "A"},
            {"url": "u5", "ts_epoch": 99, "text": "C"},
        ],
        mtime=2_000_000,
    )
    stream = (
        spark.readStream.schema("url string, ts_epoch long, text string")
        .option("maxFilesPerTrigger", 1)
        .json(str(src))
    )
    kept = dedup_stream_first_seen(stream)
    q = (
        kept.writeStream.format("memory")
        .queryName("dedup_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = {
        r["url"]: r["ts_epoch"]
        for r in spark.sql("SELECT * FROM dedup_out").collect()
    }
    # A's batch-1 arrival at ts=5 is EARLIER than the batch-0 winner, but
    # first-SEEN semantics keep the batch-0 election — that's the contract
    assert rows == {"u2": 10, "u3": 20, "u5": 99}


def test_compaction_refuses_during_in_flight_stream_run(spark, tmp_path):
    """VERDICT r3 #8: recanonicalize_output's orphan-drop must not eat a
    streaming run that has appended triples but not yet its manifest row
    (the intent-marker window).  Contract: compaction REFUSES while a fresh
    intent marker exists; after the run commits it proceeds and the run's
    rows survive; a STALE intent marker (crashed run) is compacted away as
    an orphan, which stream replay then re-appends via its _run_landed
    probe."""
    import os
    import time as _time

    from aiwhispr_spark.plans.kg_pipeline import build_knowledge_graph, recanonicalize_output
    from aiwhispr_spark.sources.synthetic import write_corpus_parquet
    from aiwhispr_spark.streaming.kg_stream import make_stream_sink

    corpus = str(tmp_path / "corpus.parquet")
    write_corpus_parquet(corpus, n_docs=20)
    docs = spark.read.parquet(corpus)
    out = str(tmp_path / "kg")
    # batch run creates the aliases table compaction refreshes against
    build_knowledge_graph(spark, docs, output_dir=out, run_id="batch1")

    # simulate a streaming batch frozen mid-window: intent marker up,
    # triples appended, manifest NOT yet written (the sink does exactly this
    # sequence — reproduced here with the sink's own marker layout)
    intents = os.path.join(out, "_stream_intents")
    os.makedirs(intents, exist_ok=True)
    open(os.path.join(intents, "stream-42"), "w").close()
    stream_rows = spark.read.parquet(out + "/triples").limit(3).withColumn(
        "run_id", F.lit("stream-42")
    )
    stream_rows.write.mode("append").parquet(out + "/triples")
    n_stream = 3

    with pytest.raises(RuntimeError, match="in flight"):
        recanonicalize_output(spark, out)
    # refused → the in-flight rows are untouched
    live = spark.read.parquet(out + "/triples").filter(F.col("run_id") == "stream-42")
    assert live.count() == n_stream

    # run commits: manifest row lands, intent marker removed → compaction
    # proceeds and the run's rows SURVIVE
    spark.createDataFrame(
        [("u", 0, n_stream, "stream-42")],
        "url string, partition_id int, rows_out long, run_id string",
    ).withColumn("completed_ts", F.current_timestamp()).write.mode("append").parquet(
        out + "/manifest"
    )
    os.remove(os.path.join(intents, "stream-42"))
    recanonicalize_output(spark, out)
    survived = spark.read.parquet(out + "/triples").filter(
        F.col("run_id") == "stream-42"
    )
    assert survived.count() == n_stream

    # stale-intent path: a crashed manifestless run IS dropped once its
    # marker ages past the threshold
    open(os.path.join(intents, "stream-99"), "w").close()
    old = _time.time() - 7200
    os.utime(os.path.join(intents, "stream-99"), (old, old))
    spark.read.parquet(out + "/triples").limit(2).withColumn(
        "run_id", F.lit("stream-99")
    ).write.mode("append").parquet(out + "/triples")
    recanonicalize_output(spark, out)
    gone = spark.read.parquet(out + "/triples").filter(F.col("run_id") == "stream-99")
    assert gone.count() == 0


def test_wait_for_compaction_lock_semantics(tmp_path):
    """The sink side of the Dekker pair (kg_stream._wait_for_compaction):
    no lock → proceed; stale lock → proceed (crashed compaction); live lock
    → bounded wait then RuntimeError; lock removed mid-wait → proceed."""
    import os
    import threading
    import time as _time

    from aiwhispr_spark.streaming.kg_stream import _wait_for_compaction

    lock = str(tmp_path / "_compaction_lock")
    # no lock
    _wait_for_compaction(lock, max_wait_s=0.1)
    # stale lock
    open(lock, "w").close()
    old = _time.time() - 7200
    os.utime(lock, (old, old))
    _wait_for_compaction(lock, max_wait_s=0.1, stale_after_s=3600)
    # live lock → raises after the bounded wait
    os.utime(lock, None)
    with pytest.raises(RuntimeError, match="compaction lock"):
        _wait_for_compaction(lock, max_wait_s=0.5)
    # lock released while waiting → proceeds
    os.utime(lock, None)
    t = threading.Timer(1.0, os.remove, args=(lock,))
    t.start()
    t0 = _time.time()
    _wait_for_compaction(lock, max_wait_s=30.0)
    assert _time.time() - t0 < 10


def test_dedup_sink_replay_heals_orphan_dropped_triples(spark, tmp_path):
    """Review r4: with dedup=True, the digest-store read must EXCLUDE the
    current run_id.  Scenario: a crashed attempt landed triples+digests but
    no manifest; a stale-intent compaction orphan-dropped the triples; the
    replay must re-extract and re-append them — with an own-run digest hit
    the batch would dedup against itself, append nothing, and mark every
    url processed (silent permanent loss)."""
    import os
    import shutil

    from aiwhispr_spark.sources.synthetic import write_corpus_parquet
    from aiwhispr_spark.streaming.kg_stream import make_stream_sink

    corpus = str(tmp_path / "corpus.parquet")
    write_corpus_parquet(corpus, n_docs=12)
    docs = spark.read.parquet(corpus)
    out = str(tmp_path / "kg")
    sink = make_stream_sink(out, dedup=True)

    # clean run to learn the expected output, then simulate the
    # crash+compaction state: triples GONE, digests present, intent marker
    # up, no commit marker, no manifest
    sink(docs, 3)
    expected = spark.read.parquet(out + "/triples").count()
    assert expected > 0
    shutil.rmtree(out + "/triples")
    shutil.rmtree(out + "/manifest")
    os.remove(os.path.join(out, "_stream_commits", "stream-3"))
    open(os.path.join(out, "_stream_intents", "stream-3"), "w").close()

    sink(docs, 3)  # replay
    healed = spark.read.parquet(out + "/triples").count()
    assert healed == expected, (
        f"replay re-appended {healed} of {expected} triples — own-run "
        f"digests suppressed re-extraction"
    )
    assert os.path.exists(os.path.join(out, "_stream_commits", "stream-3"))
