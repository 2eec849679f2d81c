"""PySpark Python Data Source: ``spark.read.format("binance_klines")``.

The fully Spark-native form of the paginated kline scan (SURVEY.md S1-S6):
partition planning happens in the source (one InputPartition per
symbol-shard), so Catalyst sees an ordinary scan — every executor core pulls
its shard through the same watermark-pagination loop + token bucket used by
the mapInPandas path, but with no driver-side DataFrame choreography.

Usage::

    spark.dataSource.register(BinanceKlinesDataSource)
    df = (spark.read.format("binance_klines")
          .option("symbols", "SYM000USDT,SYM001USDT")
          .option("start_ms", 1704067200000)
          .option("end_ms",   1704153600000)
          .option("interval", "1h")
          .option("backend",  "synthetic")   # or "rest" (network)
          .load())

Output schema = the raw page shape (strings + epoch-ms), i.e. the input to
``operators.etl.clean_klines``.
"""

from __future__ import annotations

from collections.abc import Iterator, Sequence

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition
from pyspark.sql.types import StructType

from binance_etl_clickhouse_spark.sources.fetcher import (
    RAW_FETCH_SCHEMA,
    FetchConfig,
    paginate_symbol,
    synthetic_page_fn,
)
from binance_etl_clickhouse_spark.sources.ratelimit import TokenBucket


class KlineShard(InputPartition):
    def __init__(self, symbol: str, start_ms: int, end_ms: int):
        self.symbol = symbol
        self.start_ms = start_ms
        self.end_ms = end_ms


class BinanceKlinesReader(DataSourceReader):
    def __init__(self, schema: StructType, options: dict):
        self.schema_ = schema
        self.symbols = [s for s in options.get("symbols", "").split(",") if s]
        self.start_ms = int(options.get("start_ms", 1704067200000))
        self.end_ms = int(options.get("end_ms", self.start_ms))
        self.interval = options.get("interval", "1h")
        self.page_limit = int(options.get("page_limit", 1000))
        self.backend = options.get("backend", "synthetic")
        self.shard_ms = int(options.get("shard_ms", 0))  # 0 = one shard/symbol
        self.budget_calls = int(options.get("budget_calls", 2750))

    def partitions(self) -> Sequence[InputPartition]:
        """One InputPartition per symbol (or per symbol sub-range when
        ``shard_ms`` caps shard width — the hot-symbol mitigation)."""
        shards: list[KlineShard] = []
        for sym in self.symbols:
            if self.shard_ms <= 0:
                shards.append(KlineShard(sym, self.start_ms, self.end_ms))
            else:
                lo = self.start_ms
                while lo <= self.end_ms:
                    hi = min(lo + self.shard_ms - 1, self.end_ms)
                    shards.append(KlineShard(sym, lo, hi))
                    lo = hi + 1
        return shards

    def read(self, partition: KlineShard) -> Iterator[tuple]:
        if partition is None:  # empty partitions() -> Spark still calls read(None)
            return
        from binance_etl_clickhouse_spark.sources.synthetic import INTERVAL_MS

        cfg = FetchConfig(interval=self.interval, page_limit=self.page_limit)
        if self.backend == "rest":  # pragma: no cover — network only
            from binance_etl_clickhouse_spark.sources.fetcher import (
                binance_rest_page_fn,
            )

            page_fn = binance_rest_page_fn(interval=self.interval)
        else:
            page_fn = synthetic_page_fn(
                interval_ms=INTERVAL_MS[self.interval], origin_ms=self.start_ms
            )
        # budget divided by planned PARTITION count (C2, cluster-global
        # safety): with shard_ms > 0 one symbol fans out into many
        # concurrently-scheduled shards, so dividing by the symbol count
        # would let each shard claim a full per-symbol allowance and
        # multiply the global call rate by the shard factor
        n_parts = max(1, len(self.partitions()))
        bucket = TokenBucket(
            max(1, self.budget_calls // n_parts), 60.0
        )
        for pdf in paginate_symbol(
            partition.symbol, partition.start_ms, partition.end_ms, page_fn, cfg, bucket
        ):
            pdf = pdf.copy()
            pdf["fetch_error"] = None
            for row in pdf.itertuples(index=False):
                yield tuple(row)


class BinanceKlinesDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "binance_klines"

    def schema(self) -> str:
        return RAW_FETCH_SCHEMA

    def reader(self, schema: StructType) -> DataSourceReader:
        return BinanceKlinesReader(schema, self.options)
