"""Zone-map sparse-index rehearsal: measure driver-side file pruning.

Builds a multi-month, multi-symbol ServingTable from synthetic klines
(append per symbol-group so files stay key-clustered), builds the zone map,
then times a point lookup three ways: full-scan + filter, zone-map-pruned
read, and the pruned read's file count vs total. Prints one JSON line per
phase; numbers land in SCALE.md.

Run: python scripts/zonemap_bench.py [--symbols N] [--bars N] [--groups N]
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
    ap.add_argument("--bars", type=int, default=20_000)
    ap.add_argument("--groups", type=int, default=8)
    args = ap.parse_args()

    from binance_etl_clickhouse_spark.operators.etl import clean_klines
    from binance_etl_clickhouse_spark.schemas import KLINES_PK
    from binance_etl_clickhouse_spark.session import get_spark
    from binance_etl_clickhouse_spark.sources.synthetic import synthetic_klines_raw
    from binance_etl_clickhouse_spark.storage import zonemap as zm
    from binance_etl_clickhouse_spark.storage.table import ServingTable

    spark = get_spark(app_name="zonemap_bench")
    base = tempfile.mkdtemp(prefix="zonemap_")
    try:
        t = ServingTable(
            path=f"{base}/klines",
            keys=KLINES_PK,
            time_col="timestamp",
            sort_cols=["symbol", "type", "interval", "timestamp"],
        )
        full = clean_klines(
            synthetic_klines_raw(
                spark, n_symbols=args.symbols, bars_per_symbol=args.bars
            ),
            market_type="SPOT",
            interval="1h",
        ).cache()
        n_rows = full.count()
        syms = sorted(r.symbol for r in full.select("symbol").distinct().collect())
        per = max(1, len(syms) // args.groups)
        t0 = time.time()
        for gi in range(0, len(syms), per):
            group = syms[gi : gi + per]
            t.append(full.filter(F.col("symbol").isin(group)), ingest_seq=gi + 1)
        print(json.dumps({"phase": "ingest", "rows": n_rows, "sec": round(time.time() - t0, 2)}))
        full.unpersist()

        t0 = time.time()
        t.build_zonemap()
        n_files = len(zm.read_zonemap(t.path)["files"])
        print(json.dumps({"phase": "build_zonemap", "files": n_files, "sec": round(time.time() - t0, 2)}))

        target = syms[0]

        t0 = time.time()
        a = t.read(spark).filter(F.col("symbol") == target).count()
        full_s = round(time.time() - t0, 2)

        t0 = time.time()
        b = t.read_pruned(spark, {"symbol": ("eq", target)}).count()
        pruned_s = round(time.time() - t0, 2)
        assert a == b, (a, b)

        kept = len(
            zm.prune_files(zm.read_zonemap(t.path), t.path, {"symbol": ("eq", target)})
        )
        print(
            json.dumps(
                {
                    "phase": "point_lookup",
                    "rows": a,
                    "full_scan_sec": full_s,
                    "pruned_sec": pruned_s,
                    "files_read": kept,
                    "files_total": n_files,
                }
            )
        )
    finally:
        shutil.rmtree(base, ignore_errors=True)


if __name__ == "__main__":
    main()
