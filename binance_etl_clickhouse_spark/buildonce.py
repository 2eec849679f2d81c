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
  part-files into one dir was the observable race). A lock older than
  the wait budget (env ``SPARK_GRAFT_BUILD_WAIT_S``, default 600 s) is
  treated as stale — the builder died without releasing — removed, and
  re-claimed through ``mkdir``. Best-effort boundary: a healthy build
  running LONGER than the budget can be mistaken for dead (there is no
  heartbeat); size the budget above the slowest expected build. Builders
  must be idempotent overwrites.
"""

from __future__ import annotations

import hashlib
import os
import shutil
import tempfile
import time
from collections.abc import Callable

_WAIT_S = float(os.environ.get("SPARK_GRAFT_BUILD_WAIT_S", "600"))
_POLL_S = 0.1


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
    deadline = time.monotonic() + _WAIT_S
    while True:
        if os.path.isfile(marker_path):
            return path
        try:
            os.mkdir(lock)  # the ONLY claim primitive — atomic, one winner
        except FileExistsError:
            if time.monotonic() >= deadline:
                # stale lock (builder died without releasing): remove and
                # loop back to the atomic mkdir — racing reclaimers collide
                # there, so still at most one builds. Reset the budget so a
                # waiter that loses the re-claim grants the new builder a
                # full window instead of rm-ing its fresh lock every poll.
                shutil.rmtree(lock, ignore_errors=True)
                deadline = time.monotonic() + _WAIT_S
            time.sleep(_POLL_S)
            continue
        try:
            if not os.path.isfile(marker_path):
                builder(path)
            return path
        finally:
            shutil.rmtree(lock, ignore_errors=True)
