"""Progress-checkpoint state — the reference's progress.json as a table.

The reference writes ``{"completed": [...]}`` per cache dir and skips those
symbols on restart (crypto_data_pipeline_clickhouse.py:317-322, :339). Here
the completed set is a small parquet table and the skip is a broadcast
left-anti join (SURVEY.md P7/T2) — the same crash-resume semantic,
cluster-visible, and composable into the symbol-selection plan.
"""

from __future__ import annotations

import os
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from binance_etl_clickhouse_spark.schemas import PROGRESS


@dataclass
class ProgressTable:
    path: str
    key: str = "symbol"

    def read(self, spark: SparkSession) -> DataFrame:
        if not os.path.isdir(self.path):
            return spark.createDataFrame([], PROGRESS)
        return spark.read.parquet(self.path)

    def pending(self, symbols: DataFrame, spark: SparkSession) -> DataFrame:
        """Anti-join the completed set off the symbol dimension (P7)."""
        done = self.read(spark).select(self.key)
        return symbols.join(F.broadcast(done), self.key, "left_anti")

    def mark_done(self, symbols: DataFrame) -> None:
        symbols.select(self.key).distinct().write.mode("append").parquet(self.path)

    def clear(self) -> None:
        """≙ clearing progress.json after a successful load (reference :653-656)."""
        import shutil

        if os.path.isdir(self.path):
            shutil.rmtree(self.path)
