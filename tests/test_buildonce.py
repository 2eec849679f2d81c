"""build_once lock discipline: completed builds reuse, crashed builds
retry, staleness is judged by the LOCK's heartbeat-refreshed age (not any
waiter's own wait time), and a live-but-slow builder is never reclaimed.

Pure-filesystem tests (no Spark). The tiny budgets come from monkeypatching
the module constants, not the env, so they can't leak across tests.
"""

from __future__ import annotations

import os
import threading
import time

import pytest

from binance_etl_clickhouse_spark import buildonce


@pytest.fixture(autouse=True)
def _tmp_tempdir(tmp_path, monkeypatch):
    # isolate the shared-tempdir keying per test
    monkeypatch.setenv("TMPDIR", str(tmp_path))
    import tempfile

    monkeypatch.setattr(tempfile, "tempdir", str(tmp_path))
    yield


def test_builds_once_and_reuses(tmp_path):
    calls = []

    def builder(p):
        os.makedirs(p, exist_ok=True)
        calls.append(p)
        with open(os.path.join(p, "done"), "w") as f:
            f.write("x")

    p1 = buildonce.build_once("t1", "k", "done", builder)
    p2 = buildonce.build_once("t1", "k", "done", builder)
    assert p1 == p2
    assert calls == [p1], "second call must reuse, not rebuild"


def test_crashed_half_build_is_rebuilt(tmp_path):
    def crasher(p):
        os.makedirs(p, exist_ok=True)
        with open(os.path.join(p, "partial"), "w") as f:
            f.write("x")
        raise RuntimeError("boom")

    with pytest.raises(RuntimeError):
        buildonce.build_once("t2", "k", "done", crasher)

    done = []

    def builder(p):
        os.makedirs(p, exist_ok=True)
        done.append(p)
        with open(os.path.join(p, "done"), "w") as f:
            f.write("x")

    p = buildonce.build_once("t2", "k", "done", builder)
    assert done == [p], "no marker -> the next caller must rebuild"


def test_stale_dead_lock_is_reclaimed(monkeypatch):
    monkeypatch.setattr(buildonce, "_WAIT_S", 0.3)
    monkeypatch.setattr(buildonce, "_POLL_S", 0.02)
    # simulate a builder that died without releasing: a lock dir with an
    # old mtime and no heartbeat
    key_material = "dead"
    import hashlib, tempfile

    key = hashlib.md5(key_material.encode()).hexdigest()[:12]
    uid = os.getuid()
    path = os.path.join(tempfile.gettempdir(), f"spark_graft_t3_{uid}_{key}")
    lock = path + ".lock"
    os.mkdir(lock)
    old = time.time() - 10
    os.utime(lock, (old, old))

    built = []

    def builder(p):
        os.makedirs(p, exist_ok=True)
        built.append(p)
        with open(os.path.join(p, "done"), "w") as f:
            f.write("x")

    t0 = time.monotonic()
    p = buildonce.build_once("t3", key_material, "done", builder)
    assert built == [p]
    assert time.monotonic() - t0 < 5, "reclaim must not hang"


def test_live_slow_builder_is_not_reclaimed_by_staggered_waiter(monkeypatch):
    """The ADVICE scenario: builder A holds the lock and builds for LONGER
    than a waiter's whole budget. With lock-mtime staleness + A's heartbeat
    the waiter must keep waiting (never rmtree A's lock), then reuse A's
    completed build — exactly one build happens."""
    monkeypatch.setattr(buildonce, "_WAIT_S", 0.4)
    monkeypatch.setattr(buildonce, "_POLL_S", 0.02)
    monkeypatch.setattr(buildonce, "_HEARTBEAT_S", 0.05)

    build_count = []
    build_time = 1.2  # 3x the budget

    def slow_builder(p):
        build_count.append(1)
        os.makedirs(p, exist_ok=True)
        time.sleep(build_time)
        with open(os.path.join(p, "done"), "w") as f:
            f.write("x")

    results = {}

    def run(tag, delay):
        time.sleep(delay)
        results[tag] = buildonce.build_once("t4", "slow", "done", slow_builder)

    a = threading.Thread(target=run, args=("a", 0.0))
    # staggered waiter: arrives mid-build, its private budget would expire
    # while A is still healthy — the old waiter-deadline design rmtree'd
    # A's lock here
    b = threading.Thread(target=run, args=("b", 0.2))
    a.start(), b.start()
    a.join(), b.join()
    assert results["a"] == results["b"]
    assert len(build_count) == 1, "the staggered waiter must not steal a live lock"


def test_heartbeat_refreshes_lock_mtime(monkeypatch, tmp_path):
    monkeypatch.setattr(buildonce, "_HEARTBEAT_S", 0.05)
    lock = str(tmp_path / "x.lock")
    os.mkdir(lock)
    old = time.time() - 100
    os.utime(lock, (old, old))
    stop = threading.Event()
    t = threading.Thread(target=buildonce._heartbeat, args=(lock, stop), daemon=True)
    t.start()
    time.sleep(0.2)
    stop.set()
    t.join()
    assert time.time() - os.stat(lock).st_mtime < 10
