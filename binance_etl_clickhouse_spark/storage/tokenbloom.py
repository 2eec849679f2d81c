"""Token bloom-filter skip index — the ClickHouse ``tokenbf_v1`` analogue.

ClickHouse lets a table declare ``INDEX idx text TYPE tokenbf_v1(m, k, seed)``
so that ``hasToken(text, 'word')`` predicates skip whole granules whose bloom
filter cannot contain the token (the backing store of the reference offers
this on any String column). Here the same idea lands at parquet-file
granularity, sibling to the zone map (``storage/zonemap.py``): one bloom
filter of each file's DISTINCT whitespace tokens lives in a sidecar, and a
contains-token query prunes the file list DRIVER-side before Spark schedules
a single task. Bloom false positives only ever keep extra files — pruning is
conservative — and the caller re-applies the predicate as a normal filter,
so reads stay correct with a stale or missing sidecar (fall back = full
scan), exactly the zone-map contract.

Build shape (the part that matters at 100 TB): ONE distributed pass —
per-file distinct tokens (map-side ``distinct`` on (file, token)), k bit
positions per token, OR'd into 64-bit words by ``bit_or`` partial
aggregation. The driver collects only ``files x m/64`` longs (a 1024-bit
bloom = 16 longs per file), never tokens. Probing is pure driver-side
arithmetic on the sidecar: md5-based positions reproduce bit-identically
between the Spark build (conv(substr(md5(..)))) and the Python probe
(hashlib), the same cross-engine-hash contract as ``operators/texthash``.

Sizing: m=1024 bits / k=3 gives <1% false positives up to ~100 distinct
tokens per file and degrades gracefully; callers with bigger files pass a
bigger ``m`` (cost is sidecar bytes, build plan unchanged).
"""

from __future__ import annotations

import hashlib
import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from binance_etl_clickhouse_spark.operators.texthash import hash60, tokens
from binance_etl_clickhouse_spark.storage.zonemap import data_files

TOKENBLOOM_SIDECAR = "_tokenbloom.json"  # leading "_" -> invisible to Spark

BLOOM_BITS = 1024
BLOOM_HASHES = 3

_U64 = (1 << 64) - 1


def _probe_positions(token: str, m: int, k: int) -> list[int]:
    """Driver-side twin of the Spark-side bit positions: the j-th position is
    hash60('tb{j}:' || token) % m, via hashlib instead of Spark md5."""
    out = []
    for j in range(k):
        h = hashlib.md5(f"tb{j}:{token}".encode("utf-8")).hexdigest()
        out.append(int(h[:15], 16) % m)
    return out


def build_token_bloom(
    spark: SparkSession,
    table_path: str,
    text_col: str = "text",
    m: int = BLOOM_BITS,
    k: int = BLOOM_HASHES,
) -> dict:
    """One scan over the table -> per-file token blooms -> sidecar.

    The shuffle carries distinct (file, token) pairs (partial-agg'd
    map-side); the collect carries m/64 longs per file.
    """
    n_words = m // 64
    files = (
        spark.read.parquet(table_path)
        .select(
            F.input_file_name().alias("file"),
            F.explode(tokens(text_col)).alias("token"),
        )
        .distinct()
    )
    pos = F.explode(
        F.array(
            *[
                (hash60(F.concat(F.lit(f"tb{j}:"), F.col("token"))) % m).cast("int")
                for j in range(k)
            ]
        )
    ).alias("pos")
    bits = (
        files.select("file", pos)
        .select(
            "file",
            (F.col("pos") / 64).cast("int").alias("word_idx"),
            # pyspark's shiftleft() only takes a literal shift — go via SQL
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(pos % 64 AS INT))").alias("bit"),
        )
        .groupBy("file", "word_idx")
        .agg(F.bit_or("bit").alias("word"))
        .collect()
    )
    # seed EVERY data file with an empty bloom — zero-row part files produce
    # no scan output but must still be covered or the freshness check would
    # force a full-scan fallback forever (an empty bloom correctly prunes
    # the file for every token)
    per_file: dict[str, list[int]] = {
        rel: [0] * n_words for rel in data_files(table_path)
    }
    root = os.path.abspath(table_path)
    for r in bits:
        # input_file_name is a URI (file:///...); relativize against the table
        p = r.file
        if p.startswith("file:"):
            p = p[len("file:"):]
            while p.startswith("//"):
                p = p[1:]
        rel = os.path.relpath(os.path.abspath(p), root)
        words = per_file.setdefault(rel, [0] * n_words)
        words[r.word_idx] |= r.word & _U64
    idx = {"text_col": text_col, "m": m, "k": k, "files": per_file}
    tmp = os.path.join(table_path, TOKENBLOOM_SIDECAR + ".tmp")
    with open(tmp, "w") as f:
        json.dump(idx, f)
    os.replace(tmp, os.path.join(table_path, TOKENBLOOM_SIDECAR))
    return idx


def read_token_bloom(table_path: str) -> dict | None:
    try:
        with open(os.path.join(table_path, TOKENBLOOM_SIDECAR)) as f:
            idx = json.load(f)
        if not isinstance(idx.get("files"), dict) or "m" not in idx or "k" not in idx:
            return None
        return idx
    except (OSError, ValueError):
        return None


#: prune-benefit bail-out (r10 verdict item 5): when the bloom keeps more
#: than this fraction of the files, the explicit per-file read plan costs
#: more than it saves (measured r10: scattered layout, 0% pruned, +0.09 s
#: vs the plain directory scan) — fall back to the full scan instead.
PRUNE_BAILOUT_KEEP_FRAC = 0.9


def prune_files_with_token(
    idx: dict, table_path: str, token: str
) -> list[str] | None:
    """Files that MAY contain ``token`` (bloom semantics), absolute paths.

    Returns ``None`` — "fall back to the full scan" — when the sidecar is
    stale (any data file on disk is missing from it), so out-of-band writes
    can never lose rows to pruning. Pure prune decision: the READ paths
    apply :func:`prune_worth_it` on top before switching to the explicit
    file-list plan.
    """
    on_disk = data_files(table_path)
    known = idx["files"]
    if any(rel not in known for rel in on_disk):
        return None
    positions = _probe_positions(token, idx["m"], idx["k"])
    keep = []
    for rel in on_disk:
        words = known[rel]
        if all((words[p // 64] >> (p % 64)) & 1 for p in positions):
            keep.append(os.path.join(table_path, rel))
    return keep


def prune_worth_it(pruned: list[str] | None, table_path: str) -> bool:
    """Whether the explicit per-file read plan beats the plain directory
    scan: False when pruning kept more than ``PRUNE_BAILOUT_KEEP_FRAC`` of
    the files — a scattered token layout, where the file-list plan only
    adds listing overhead (measured r10: 0% pruned, +0.09 s)."""
    if pruned is None:
        return False
    total = len(data_files(table_path))
    return total == 0 or len(pruned) <= PRUNE_BAILOUT_KEEP_FRAC * total


def read_containing(
    spark: SparkSession, table_path: str, token: str, text_col: str = "text"
) -> DataFrame:
    """hasToken read path: bloom-prune the file list driver-side, then
    re-apply the exact predicate over the surviving files — correct whether
    or not pruning happened (bloom hits are a superset of true matches)."""
    idx = read_token_bloom(table_path)
    pruned = None
    if idx is not None and idx.get("text_col") == text_col:
        pruned = prune_files_with_token(idx, table_path, token)
    if not prune_worth_it(pruned, table_path):
        df = spark.read.parquet(table_path)
    elif not pruned:
        df = spark.read.parquet(table_path).limit(0)
    else:
        df = spark.read.parquet(*pruned)
    return df.filter(F.array_contains(tokens(text_col), token))
