"""binance_etl_clickhouse_spark — a PySpark-native analytics engine.

Re-implements, Spark-first, the query and data-processing capabilities of the
reference ETL pipeline (Binance REST -> parquet staging -> ClickHouse serving
tables), replacing:

- pandas in-process transforms  -> Spark DataFrame / SQL (Catalyst + Tungsten)
- ClickHouse MergeTree serving  -> monthly-partitioned, sorted parquet tables
- ReplacingMergeTree dedup      -> keep-last window dedup view / compaction
- ThreadPool fetch fan-out      -> partitioned ``mapInPandas`` sources
- while/sleep scheduler         -> Structured Streaming triggers

plus large-scale training-data-pipeline operators (dedup, similarity search,
text analysis, multimodal columns) designed for 100 TB-scale partitioning.
"""

__version__ = "0.1.0"
