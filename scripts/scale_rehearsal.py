"""100x-shape rehearsal: synthetic klines ingest -> re-ingest overlap ->
dedup read -> rollup refresh -> compact -> dedup read again.

Exercises the full storage lifecycle at a deliberately larger-than-test
scale (default 64 symbols x 40k hourly bars ~ 2.56M rows + 1.28M overlap
re-fetch versions) and prints one JSON line per phase; numbers land in
SCALE.md. Run: python scripts/scale_rehearsal.py [--symbols N] [--bars N]
"""

from __future__ import annotations

import argparse
import json
import shutil
import sys
import tempfile
import time
from pathlib import Path

from pyspark.sql import functions as F

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--symbols", type=int, default=64)
    ap.add_argument("--bars", type=int, default=40_000)
    ap.add_argument("--overlap", type=int, default=20_000)  # re-fetched tail
    args = ap.parse_args()

    from binance_etl_clickhouse_spark.operators.etl import clean_klines
    from binance_etl_clickhouse_spark.schemas import KLINES_PK
    from binance_etl_clickhouse_spark.session import get_spark
    from binance_etl_clickhouse_spark.sources.synthetic import synthetic_klines_raw
    from binance_etl_clickhouse_spark.storage.rollup import RollupTable
    from binance_etl_clickhouse_spark.storage.table import ServingTable

    spark = get_spark(app_name="scale_rehearsal")
    base = tempfile.mkdtemp(prefix="rehearsal_")
    table = ServingTable(
        path=f"{base}/klines",
        keys=KLINES_PK,
        time_col="timestamp",
        sort_cols=["symbol", "type", "interval", "timestamp"],
    )
    rollup = RollupTable(
        path=f"{base}/klines_daily",
        source=table,
        granularity="day",
        group_cols=["symbol", "type", "interval"],
        aggs=lambda: [
            F.min_by("open", "timestamp").alias("open"),
            F.max("high").alias("high"),
            F.min("low").alias("low"),
            F.max_by("close", "timestamp").alias("close"),
            F.sum("volume").alias("volume"),
            F.sum("trades_count").alias("trades_count"),
            F.count(F.lit(1)).alias("n_bars"),
        ],
    )

    def phase(name: str, fn):
        t0 = time.perf_counter()
        out = fn()
        dt = round(time.perf_counter() - t0, 2)
        print(json.dumps({"phase": name, "sec": dt, **(out or {})}), flush=True)
        return dt

    def ingest():
        raw = synthetic_klines_raw(
            spark, n_symbols=args.symbols, bars_per_symbol=args.bars, overlap_bars=0
        )
        table.append(clean_klines(raw, "SPOT", "1h"), ingest_seq=1)
        return {"rows": args.symbols * args.bars}

    def reingest_overlap():
        raw = synthetic_klines_raw(
            spark,
            n_symbols=args.symbols,
            bars_per_symbol=args.overlap,
            overlap_bars=args.overlap,  # all rows duplicate existing keys
        )
        table.append(clean_klines(raw, "SPOT", "1h"), ingest_seq=2)
        return {"rows": args.symbols * args.overlap}

    def dedup_read():
        n = table.read(spark).count()
        return {"snapshot_rows": n}

    def rollup_refresh():
        months = rollup.refresh(spark)
        return {"months": len(months), "rollup_rows": rollup.read(spark).count()}

    def compact():
        table.compact(spark)
        return {}

    def compact_zorder():
        # at production scale AQE's ~64 MB coalesce target yields many tiles
        # per month on its own; at rehearsal volume it would collapse a month
        # to 1-2 files and hide the tiling, so pin the tile count explicitly
        months = table.read_raw(spark).select(F.col("month")).distinct().count()
        prev = spark.conf.get("spark.sql.shuffle.partitions")
        spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
        spark.conf.set("spark.sql.shuffle.partitions", str(months * 16))
        try:
            table.compact(spark, zorder=("symbol", "timestamp"))
        finally:
            spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "true")
            spark.conf.set("spark.sql.shuffle.partitions", prev)
        return {}

    def layout_audit():
        """Fraction of one month's files a 7-day time slice must read —
        the footer-pruning cost of a time-only query under the current
        layout (symbol-sorted: ~1.0; z-ordered: tiles prune)."""
        import datetime
        import glob

        from binance_etl_clickhouse_spark.storage.zorder import (
            file_overlap_fraction,
        )

        t0 = table.read_raw(spark).agg(F.min("timestamp").alias("t0")).first().t0
        lo = t0 + datetime.timedelta(days=40)  # inside the 2nd month
        hi = lo + datetime.timedelta(days=7)
        month = f"{lo.year:04d}{lo.month:02d}"
        d = glob.glob(f"{table.path}/month={month}")[0]
        n = len(glob.glob(d + "/*.parquet"))
        return {
            "time_slice_file_fraction": round(
                file_overlap_fraction(d, "timestamp", lo, hi), 3
            ),
            "files_in_month": n,
        }

    phase("ingest", ingest)
    phase("reingest_overlap", reingest_overlap)
    phase("dedup_read_uncompacted", dedup_read)
    phase("rollup_refresh", rollup_refresh)
    phase("compact", compact)
    phase("dedup_read_compacted", dedup_read)
    phase("rollup_refresh_noop", rollup_refresh)  # nothing new -> ~free
    phase("layout_audit_sorted", layout_audit)
    phase("compact_zorder", compact_zorder)
    phase("dedup_read_zordered", dedup_read)
    phase("layout_audit_zordered", layout_audit)
    shutil.rmtree(base, ignore_errors=True)


if __name__ == "__main__":
    main()
