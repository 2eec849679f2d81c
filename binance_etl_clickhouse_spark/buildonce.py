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
  claim: the loser waits for the winner's marker instead of both building
  into the same final path (two overwrite jobs interleaving part-files
  was the observable race). A lock older than the wait budget is treated
  as stale (builder died) and the waiter builds itself — best-effort, not
  a distributed lock manager; builders must be idempotent overwrites.
"""

from __future__ import annotations

import hashlib
import os
import shutil
import tempfile
import time
from collections.abc import Callable

_WAIT_S = 120.0
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
    if os.path.isfile(marker_path):
        return path
    lock = path + ".lock"
    try:
        os.mkdir(lock)
    except FileExistsError:
        deadline = time.monotonic() + _WAIT_S
        while time.monotonic() < deadline:
            if os.path.isfile(marker_path):
                return path
            if not os.path.isdir(lock):
                break  # winner finished (or died) and released
            time.sleep(_POLL_S)
        # stale lock or failed builder: claim and build ourselves
        shutil.rmtree(lock, ignore_errors=True)
        os.makedirs(lock, exist_ok=True)
    try:
        if not os.path.isfile(marker_path):
            builder(path)
        return path
    finally:
        shutil.rmtree(lock, ignore_errors=True)
