"""Driver-mirror validation of the DRIVER_WINDOW at sf0.01.

Runs the first-50 registered queries exactly the way the correctness
driver does: a PLAIN SparkSession (no repo-tuned confs, default 200
shuffle partitions, UTC) vs the DuckDB oracle over the same parquet
views, compared with the repo's dtype-strict parity harness. Use before
every window rotation commit — pytest runs under tuned confs, and the
one driver failure the repo has ever had (round-2 HUGEINT typing) was
invisible under the tuned session.

Usage: python scripts/validate_window.py [sf_dir] [start:stop]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    sl = slice(0, 50)
    if len(sys.argv) > 2:
        a, b = sys.argv[2].split(":")
        sl = slice(int(a), int(b))
    from binance_etl_clickhouse_spark.queries import QUERIES, oracle_sql_map
    from binance_etl_clickhouse_spark.queries import queries_map
    from binance_etl_clickhouse_spark.testing.parity import (
        compare_frames,
        run_oracle,
        spark_to_pandas,
    )

    # the driver consumes __spark_entry__.queries() = the cache-hygiene-
    # wrapped builders; mirror that exactly (raw builders would skip the
    # per-build clearCache the real sweep relies on)
    builders = queries_map(cache_hygiene=True)

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    oracles = oracle_sql_map()
    window = list(QUERIES)[sl]
    failures: list[str] = []
    for i, name in enumerate(window):
        t0 = time.time()
        try:
            sdf = spark_to_pandas(builders[name](spark, sf_dir))
        except Exception as e:  # noqa: BLE001 — report, keep sweeping
            failures.append(f"{name}: SPARK RAISED {e}")
            print(f"[{i + 1}/{len(window)}] {name}: SPARK RAISED {e}", flush=True)
            continue
        if name not in oracles:
            status = f"rows-only ({len(sdf)} rows)"
            if len(sdf) == 0:
                failures.append(f"{name}: rows-only query returned 0 rows")
        else:
            try:
                odf = run_oracle(oracles[name], sf_dir)
            except Exception as e:  # noqa: BLE001
                failures.append(f"{name}: ORACLE RAISED {e}")
                print(f"[{i + 1}/{len(window)}] {name}: ORACLE RAISED {e}", flush=True)
                continue
            problems = compare_frames(sdf, odf, name)
            status = "3/3" if not problems else "; ".join(problems)
            failures.extend(f"{name}: {p}" for p in problems)
        print(
            f"[{i + 1}/{len(window)}] {name}: {status} ({time.time() - t0:.1f}s)",
            flush=True,
        )
    print(f"\n{len(window) - len(set(f.split(':')[0] for f in failures))}"
          f"/{len(window)} green")
    for f in failures:
        print("FAIL", f)
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
