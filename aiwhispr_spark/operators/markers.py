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

Liveness: both flags carry ``"<owner pid> <created epoch> <hostname>"`` and
are HEARTBEATED (utime) while the owner works — compaction holds its lock
under a background heartbeat thread (``held``) for the WHOLE rewrite, so a
multi-hour refreshed-table job never looks crashed to a waiting appender.
A SAME-HOST marker whose pid verifiably no longer exists — or whose pid was
started AFTER the marker was written (pid recycled by an unrelated process,
checked via /proc start time) — is crashed regardless of age; one whose pid
is demonstrably alive-and-original is live regardless of age.  Markers from
ANOTHER host (shared storage) and legacy pid-only markers are unverifiable
by construction — their pid is meaningless against the local /proc / cannot
be dated — and fall back to the mtime age rule, never to a pid verdict
(review r5: a local-pid check against a foreign marker could declare a live
remote compaction dead and let an appender write under its directory swap).

Local-FS implementation; on HDFS/S3 the same touches go through the Hadoop
FileSystem API (create-with-overwrite is atomic on both), and Iceberg's
transactional commits would subsume the whole protocol.
"""

from __future__ import annotations

import contextlib
import os
import threading
import time


def touch(path: str) -> None:
    """Create/refresh a marker carrying the owner pid + creation epoch +
    hostname (the hostname scopes the pid checks: pids are only meaningful
    on the host that wrote them)."""
    import socket

    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as fh:
        fh.write(f"{os.getpid()} {time.time():.3f} {socket.gethostname()}")


def heartbeat(path: str) -> None:
    """Refresh a marker's mtime (no-op if it vanished)."""
    try:
        os.utime(path, None)
    except OSError:
        pass


@contextlib.contextmanager
def held(path: str, interval_s: float = 60.0):
    """Hold a marker under a background heartbeat for a whole critical
    section: touch on entry, utime every ``interval_s`` from a daemon
    thread, remove on exit.  This is how compaction keeps its lock looking
    live across an arbitrarily long rewrite job (a single pre-swap
    heartbeat left rewrites longer than the waiters' stale threshold
    bypassable — the ADVICE-r4 clobber window)."""
    touch(path)
    stop = threading.Event()

    def _beat() -> None:
        while not stop.wait(interval_s):
            heartbeat(path)

    t = threading.Thread(target=_beat, daemon=True, name=f"marker-heartbeat:{path}")
    t.start()
    try:
        yield
    finally:
        stop.set()
        t.join(timeout=5.0)
        try:
            os.remove(path)
        except OSError:
            pass


def _read_marker(path: str) -> tuple[int, float | None, str | None]:
    """(owner pid, created epoch, owner host) from a marker;
    (0, None, None) if unreadable.  Pre-upgrade markers carry only the pid
    — created/host stay None."""
    try:
        with open(path) as fh:
            parts = fh.read().split()
        pid = int(parts[0]) if parts else 0
        created = float(parts[1]) if len(parts) > 1 else None
        host = parts[2] if len(parts) > 2 else None
        return pid, created, host
    except (OSError, ValueError):
        return 0, None, None


def _pid_start_epoch(pid: int) -> float | None:
    """Epoch seconds at which ``pid`` started, from /proc (Linux); None when
    unknowable.  Lets us distinguish the marker's original owner from an
    unrelated process that recycled its pid."""
    try:
        with open(f"/proc/{pid}/stat") as fh:
            stat = fh.read()
        # comm (field 2) may contain spaces/parens: split after the LAST ')'
        ticks = int(stat.rsplit(")", 1)[1].split()[19])  # starttime, field 22
        with open("/proc/stat") as fh:
            btime = next(
                int(line.split()[1]) for line in fh if line.startswith("btime ")
            )
        return btime + ticks / os.sysconf("SC_CLK_TCK")
    except (OSError, ValueError, IndexError, StopIteration):
        return None


def _owner_alive(path: str) -> bool | None:
    """True: the marker's ORIGINAL owner is demonstrably alive on this host.
    False: demonstrably dead (no such pid, or the pid's current occupant
    started after the marker was written — recycled).  None: unverifiable —
    caller falls back to the age rule.  Unverifiable covers: a marker
    written on ANOTHER host (its pid is meaningless against our /proc — a
    remote owner must never be declared dead OR alive from here), a legacy
    pid-only marker (no creation epoch to date the pid against, so a
    recycled pid would otherwise look alive forever — review r5), and an
    unreadable /proc."""
    import socket

    pid, created, host = _read_marker(path)
    if pid <= 0:
        return None
    if host is None or host != socket.gethostname():
        return None  # foreign/legacy marker: only the age rule applies
    if created is None:
        return None  # cannot date the pid: recycling undetectable
    try:
        os.kill(pid, 0)
    except ProcessLookupError:
        return False
    except PermissionError:
        pass  # exists, owned by someone else — still check for recycling
    start = _pid_start_epoch(pid)
    if start is None:
        return None  # alive pid but can't date it — age rule decides
    if start > created + 1.0:
        return False  # pid recycled: current occupant postdates the marker
    return True


def wait_for_compaction(
    lock_path: str, max_wait_s: float = 600.0, stale_after_s: float = 3600.0
) -> None:
    """Block while the compaction lock is live.  Liveness mirrors
    ``fresh_intents``: a verifiably alive original owner keeps the lock live
    REGARDLESS of age (compaction heartbeats from a background thread, but
    even a missed beat must not let an appender slip under a running
    rewrite's directory swap — the ADVICE-r4 loss class); a verifiably
    dead/recycled owner releases it immediately; only an unverifiable owner
    falls back to the ``stale_after_s`` age rule.  A live lock persisting
    past ``max_wait_s`` raises — the stream's retry/replay re-runs the
    batch cleanly afterwards."""
    deadline = time.time() + max_wait_s
    while True:
        try:
            age = time.time() - os.path.getmtime(lock_path)
        except OSError:
            return  # no lock (or it vanished mid-check): compaction done
        alive = _owner_alive(lock_path)
        if alive is False:
            return  # crashed compaction (pid gone/recycled): swap never ran
        if alive is None and age > stale_after_s:
            return  # unverifiable owner + heartbeat stopped: crashed
        if time.time() > deadline:
            raise RuntimeError(
                f"compaction lock {lock_path} still live after {max_wait_s}s"
            )
        time.sleep(2.0)


def fresh_intents(intents_dir: str, max_age_s: float) -> list[str]:
    """Names of intent markers that look in-flight: younger than
    ``max_age_s`` (owners heartbeat around appends) or owned by a pid that
    is still alive-and-original on this host.  Markers vanishing mid-scan
    (their run just committed) are skipped."""
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
        if age < max_age_s or not _marker_stale(path):
            out.append(name)
    return out


def _marker_stale(path: str) -> bool:
    """An aged marker is stale unless its owner is demonstrably the original
    live process (recycled pids count as stale — ADVICE-r4: without the
    /proc start-time check, a crashed run whose pid was recycled by a
    long-lived unrelated process blocked compaction at ANY age)."""
    alive = _owner_alive(path)
    if alive is None:
        # unverifiable (foreign/unreadable): the age rule already fired
        return True
    return not alive
