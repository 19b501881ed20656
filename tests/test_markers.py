"""Marker-protocol liveness semantics (operators/markers.py) — the ADVICE-r4
upgrades: background-heartbeat lock holding, alive-owner-keeps-lock-live,
and recycled-pid detection via /proc start time."""

import os
import socket
import subprocess
import time

import pytest

from aiwhispr_spark.operators import markers

HOST = socket.gethostname()


def test_held_heartbeats_and_cleans_up(tmp_path):
    lock = str(tmp_path / "_compaction_lock")
    with markers.held(lock, interval_s=0.1):
        assert os.path.exists(lock)
        mt0 = os.path.getmtime(lock)
        # make the marker look old, then verify the background thread
        # refreshes it (this is what keeps a multi-hour rewrite live)
        old = time.time() - 7200
        os.utime(lock, (old, old))
        deadline = time.time() + 5
        while os.path.getmtime(lock) < mt0 - 3600 and time.time() < deadline:
            time.sleep(0.05)
        assert os.path.getmtime(lock) >= mt0 - 1
    assert not os.path.exists(lock)


def test_alive_owner_keeps_lock_live_regardless_of_age(tmp_path):
    """ADVICE r4 (medium): an aged lock whose owner pid is alive-and-original
    must NOT be bypassable — a rewrite longer than stale_after_s would
    otherwise let an appender slip under the directory swap."""
    lock = str(tmp_path / "_compaction_lock")
    markers.touch(lock)  # owner = this live process
    old = time.time() - 7200
    os.utime(lock, (old, old))
    with pytest.raises(RuntimeError, match="compaction lock"):
        markers.wait_for_compaction(lock, max_wait_s=0.3, stale_after_s=3600)


def test_dead_owner_releases_lock_immediately(tmp_path):
    lock = str(tmp_path / "_compaction_lock")
    p = subprocess.Popen(["true"])
    p.wait()
    with open(lock, "w") as fh:
        fh.write(f"{p.pid} {time.time():.3f} {HOST}")
    t0 = time.time()
    markers.wait_for_compaction(lock, max_wait_s=30.0, stale_after_s=3600)
    assert time.time() - t0 < 5


def test_recycled_pid_counts_as_dead(tmp_path):
    """ADVICE r4 (low): a crashed run whose pid was recycled by an unrelated
    long-lived process must not hold the protocol hostage — the /proc
    start-time check dates the pid's current occupant against the marker."""
    lock = str(tmp_path / "_compaction_lock")
    start = markers._pid_start_epoch(os.getpid())
    assert start is not None  # /proc available in this sandbox
    # marker claims it was written BEFORE this process started -> the live
    # pid cannot be the writer
    with open(lock, "w") as fh:
        fh.write(f"{os.getpid()} {start - 100:.3f} {HOST}")
    assert markers._owner_alive(lock) is False
    t0 = time.time()
    markers.wait_for_compaction(lock, max_wait_s=30.0, stale_after_s=3600)
    assert time.time() - t0 < 5


def test_fresh_intents_ignores_recycled_pid_marker(tmp_path):
    intents = tmp_path / "_stream_intents"
    intents.mkdir()
    start = markers._pid_start_epoch(os.getpid())
    stale = intents / "stream-old"
    with open(stale, "w") as fh:
        fh.write(f"{os.getpid()} {start - 100:.3f} {HOST}")
    old = time.time() - 7200
    os.utime(stale, (old, old))
    live = intents / "stream-live"
    markers.touch(str(live))
    os.utime(live, (old, old))  # aged but owner (us) is alive-and-original
    got = markers.fresh_intents(str(intents), max_age_s=3600)
    assert got == ["stream-live"]


def test_unverifiable_owner_falls_back_to_age_rule(tmp_path):
    """Cluster case: a marker with no parseable pid uses mtime age alone."""
    lock = str(tmp_path / "_compaction_lock")
    open(lock, "w").close()
    old = time.time() - 7200
    os.utime(lock, (old, old))
    t0 = time.time()
    markers.wait_for_compaction(lock, max_wait_s=30.0, stale_after_s=3600)
    assert time.time() - t0 < 5
    os.utime(lock, None)
    with pytest.raises(RuntimeError, match="compaction lock"):
        markers.wait_for_compaction(lock, max_wait_s=0.3, stale_after_s=3600)


def test_foreign_host_marker_never_gets_a_pid_verdict(tmp_path):
    """Review r5: a marker written on another host carries a pid that is
    meaningless against the local /proc — even if that pid is free locally
    (which would read 'dead') or busy locally (which would read 'alive'),
    only the age rule may decide.  Fresh foreign lock → honored; aged
    foreign lock → released by age, not by pid."""
    lock = str(tmp_path / "_compaction_lock")
    p = subprocess.Popen(["true"])
    p.wait()  # locally-dead pid — would bypass instantly if misread as ours
    with open(lock, "w") as fh:
        fh.write(f"{p.pid} {time.time():.3f} some-other-host")
    assert markers._owner_alive(lock) is None
    with pytest.raises(RuntimeError, match="compaction lock"):
        markers.wait_for_compaction(lock, max_wait_s=0.3, stale_after_s=3600)
    old = time.time() - 7200
    os.utime(lock, (old, old))
    t0 = time.time()
    markers.wait_for_compaction(lock, max_wait_s=30.0, stale_after_s=3600)
    assert time.time() - t0 < 5


def test_legacy_pid_only_marker_uses_age_rule(tmp_path):
    """Review r5: a pre-upgrade marker (pid only, no creation epoch) cannot
    be dated, so a recycled pid would look alive forever under the
    alive-wins rule — it must fall back to the age rule instead."""
    lock = str(tmp_path / "_compaction_lock")
    with open(lock, "w") as fh:
        fh.write(str(os.getpid()))  # alive pid, but legacy format
    assert markers._owner_alive(lock) is None
    old = time.time() - 7200
    os.utime(lock, (old, old))
    t0 = time.time()
    markers.wait_for_compaction(lock, max_wait_s=30.0, stale_after_s=3600)
    assert time.time() - t0 < 5
