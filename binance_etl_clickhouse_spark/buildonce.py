"""Keyed build-once for derived index artifacts in the shared tempdir.

Four query families (IVF ANN, batched IVF, IVF-PQ, materialized BM25)
materialize an index layout once per (dataset, parameters) key and reuse
it across calls. The reuse discipline lives HERE so it cannot fork across
copy-pasted blocks:

- the key hashes the full parameter material, the path carries the uid
  (multi-user tempdir) and a short key digest;
- only a COMPLETE build is reused: the caller names the marker file its
  builder writes last (Spark's ``_SUCCESS`` for parquet layouts, the meta
  sidecar for the inverted index) — a bare isdir() would treat a crashed
  half-write as built forever;
- concurrent cold starts are serialized with an atomic ``mkdir`` lock
  claim — EVERY claim (first attempt, retry after the winner releases,
  reclaim of a stale lock) goes through the same ``os.mkdir``, so exactly
  one process builds at a time (two overwrite jobs interleaving
  part-files into one dir was the observable race).

Staleness is judged by the LOCK's age, not any waiter's own wait time:
``mkdir`` stamps the claim instant into the lock dir's mtime and the
builder refreshes it as a heartbeat (daemon thread, ``os.utime`` every
``_HEARTBEAT_S``), so a lock whose mtime is older than the budget
(env ``SPARK_GRAFT_BUILD_WAIT_S``, default 600 s) means the builder DIED
mid-build — a live one, however slow, keeps the mtime fresh. Waiter-local
deadlines (the previous design) mis-fired under staggered arrival: waiter
B's private deadline could expire moments after waiter A reclaimed a dead
lock and started building, and B would then rmtree A's healthy lock well
inside A's budget — re-admitting the two-writers race. With lock-mtime
staleness every fresh claim gets a full budget from EVERY waiter's
perspective. Residual boundary: the stat→rmtree gap on reclaim is a
microsecond-scale TOCTOU (narrowed by a confirming re-stat); builders
must stay idempotent overwrites.
"""

from __future__ import annotations

import hashlib
import os
import shutil
import tempfile
import threading
import time
from collections.abc import Callable

_WAIT_S = float(os.environ.get("SPARK_GRAFT_BUILD_WAIT_S", "600"))
_POLL_S = 0.1
#: builder heartbeat period — well under the stale budget so a live
#: builder can never look dead (tiny budgets in tests still get >=10
#: refreshes per budget window)
_HEARTBEAT_S = max(min(_WAIT_S / 10.0, 10.0), 0.02)


def _heartbeat(lock: str, stop: threading.Event) -> None:
    while not stop.wait(_HEARTBEAT_S):
        try:
            os.utime(lock, None)
        except OSError:
            return  # lock vanished (forcibly reclaimed) — nothing to refresh


def build_once(
    prefix: str,
    key_material: str,
    marker: str,
    builder: Callable[[str], None],
) -> str:
    """Return the path of a completed build for ``key_material``, building
    it (exactly once across racing processes, best-effort) if missing."""
    key = hashlib.md5(key_material.encode()).hexdigest()[:12]
    uid = os.getuid() if hasattr(os, "getuid") else 0
    path = os.path.join(tempfile.gettempdir(), f"spark_graft_{prefix}_{uid}_{key}")
    marker_path = os.path.join(path, marker)
    lock = path + ".lock"
    while True:
        if os.path.isfile(marker_path):
            return path
        try:
            os.mkdir(lock)  # the ONLY claim primitive — atomic, one winner
        except FileExistsError:
            try:
                claimed_mtime = os.stat(lock).st_mtime
            except OSError:
                continue  # released between mkdir and stat — retry the claim
            if time.time() - claimed_mtime >= _WAIT_S:
                # no heartbeat for a full budget: the builder died without
                # releasing. Confirm the mtime is unchanged (a release +
                # fresh re-claim in the gap would have reset it), remove,
                # and loop back to the atomic mkdir — racing reclaimers
                # collide there, so still at most one builds.
                try:
                    if os.stat(lock).st_mtime == claimed_mtime:
                        shutil.rmtree(lock, ignore_errors=True)
                except OSError:
                    pass
            time.sleep(_POLL_S)
            continue
        stop = threading.Event()
        hb = threading.Thread(
            target=_heartbeat, args=(lock, stop), daemon=True, name="buildonce-hb"
        )
        hb.start()
        try:
            if not os.path.isfile(marker_path):
                builder(path)
            return path
        finally:
            stop.set()
            hb.join()
            shutil.rmtree(lock, ignore_errors=True)
