"""Time EVERY registered query once at $SPARK_GRAFT_SF_DIR (default sf0.1).

The headline bench (bench.py) tracks the families where regressions hurt;
this sweep is the dragnet — it surfaces any registered query whose runtime
is pathological relative to its family before the driver or a user does.
Prints one line per query sorted slowest-first, then a JSON summary.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

_REPO_ROOT = str(Path(__file__).resolve().parent.parent)
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)

from binance_etl_clickhouse_spark.queries import QUERIES  # noqa: E402
from binance_etl_clickhouse_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    spark = get_spark(app_name="full-sweep", extra_confs={
        # match bench.py's scale-appropriate shuffle sizing
        "spark.sql.shuffle.partitions": "8",
    })
    times: dict[str, float] = {}
    for name, e in QUERIES.items():
        t0 = time.time()
        try:
            df = e.spark(spark, SF_DIR)
            df.write.format("noop").mode("overwrite").save()
            times[name] = round(time.time() - t0, 3)
        except Exception as ex:  # noqa: BLE001
            times[name] = -1.0
            print(f"ERROR {name}: {ex}", file=sys.stderr)
    for name, sec in sorted(times.items(), key=lambda kv: -kv[1]):
        print(f"{sec:8.3f}  {name}")
    print(json.dumps({"sf_dir": SF_DIR, "total": round(sum(max(t, 0) for t in times.values()), 2),
                      "n": len(times), "errors": [n for n, t in times.items() if t < 0]}))


if __name__ == "__main__":
    main()
