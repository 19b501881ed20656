"""Filesystem coordination markers shared by every appender of a KG output
directory (the streaming sink, the batch pipeline's E7 writer) and its one
rewriter (compaction).

Protocol (two-sided Dekker): every appender publishes an INTENT marker
(``_stream_intents/<run_id>``) BEFORE its first append and only removes it
after its last metadata write; compaction publishes ``_compaction_lock``
BEFORE scanning the intents.  Each side writes its own flag first and then
reads the other's, so in every interleaving at least one of them yields —
compaction refuses while fresh intents exist, appenders wait while the lock
is live.

Liveness: both flags carry the owner's pid and are HEARTBEATED (utime)
around the owner's dangerous writes, so "stale" (mtime older than the
threshold) really means crashed, not merely long-running; a readable pid
that no longer exists short-circuits the age check entirely (local-FS
best-effort — on a cluster with shared storage the pid check is skipped
automatically because the pid is from another host and ``kill 0`` hitting
an unrelated live process just falls back to the age rule).

Local-FS implementation; on HDFS/S3 the same touches go through the Hadoop
FileSystem API (create-with-overwrite is atomic on both), and Iceberg's
transactional commits would subsume the whole protocol.
"""

from __future__ import annotations

import os
import time


def touch(path: str) -> None:
    """Create/refresh a marker carrying the owner pid."""
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as fh:
        fh.write(str(os.getpid()))


def heartbeat(path: str) -> None:
    """Refresh a marker's mtime (no-op if it vanished)."""
    try:
        os.utime(path, None)
    except OSError:
        pass


def _owner_dead(path: str) -> bool:
    """Best-effort: True only when the marker names a pid that verifiably
    no longer exists on THIS host.  Unparseable/foreign pids return False
    (fall back to the age rule)."""
    try:
        with open(path) as fh:
            pid = int(fh.read().strip() or "0")
    except (OSError, ValueError):
        return False
    if pid <= 0:
        return False
    try:
        os.kill(pid, 0)
        return False
    except ProcessLookupError:
        return True
    except PermissionError:
        return False  # exists, owned by someone else


def wait_for_compaction(
    lock_path: str, max_wait_s: float = 600.0, stale_after_s: float = 3600.0
) -> None:
    """Block while the compaction lock is live.  A lock whose owner pid is
    verifiably dead, or whose mtime is older than ``stale_after_s``
    (compaction heartbeats the lock around its rewrite, so a fresh mtime
    means live work), belongs to a crashed compaction and is ignored; a
    live lock persisting past ``max_wait_s`` raises — the stream's
    retry/replay re-runs the batch cleanly afterwards."""
    deadline = time.time() + max_wait_s
    while True:
        try:
            age = time.time() - os.path.getmtime(lock_path)
        except OSError:
            return  # no lock (or it vanished mid-check): compaction done
        if _owner_dead(lock_path):
            return  # crashed compaction (pid gone): its swap never ran
        if age > stale_after_s:
            return  # crashed compaction (heartbeat stopped)
        if time.time() > deadline:
            raise RuntimeError(
                f"compaction lock {lock_path} still live after {max_wait_s}s"
            )
        time.sleep(2.0)


def fresh_intents(intents_dir: str, max_age_s: float) -> list[str]:
    """Names of intent markers that look in-flight: younger than
    ``max_age_s`` (owners heartbeat around appends) or owned by a pid that
    is still alive on this host.  Markers vanishing mid-scan (their run
    just committed) are skipped."""
    if not os.path.isdir(intents_dir):
        return []
    now = time.time()
    out = []
    for name in sorted(os.listdir(intents_dir)):
        path = os.path.join(intents_dir, name)
        try:
            age = now - os.path.getmtime(path)
        except OSError:
            continue
        if age < max_age_s or (age >= max_age_s and not _marker_stale(path)):
            out.append(name)
    return out


def _marker_stale(path: str) -> bool:
    """An aged marker is stale unless its owner pid is demonstrably alive
    on this host."""
    try:
        with open(path) as fh:
            pid = int(fh.read().strip() or "0")
    except (OSError, ValueError):
        return True
    if pid <= 0:
        return True
    try:
        os.kill(pid, 0)
        return False  # owner alive: long-running, not crashed
    except ProcessLookupError:
        return True
    except PermissionError:
        return False
