"""Query registry — every implemented operator exposed as a named query.

Each entry pairs a Spark DataFrame builder ``(spark, sf_dir) -> DataFrame``
with (where SQL-expressible) an equivalent DuckDB oracle SQL string over the
driver's pre-registered testdata views. The driver hash-compares the two at
sf0.01 (order-insensitive, column-name-sorted), so both sides alias every
computed column identically.
"""

from binance_etl_clickhouse_spark.queries.registry import (  # noqa: F401
    QUERIES,
    oracle_sql_map,
    queries_map,
    register,
)

# Importing these modules populates the registry.
from binance_etl_clickhouse_spark.queries import relational  # noqa: F401,E402
from binance_etl_clickhouse_spark.queries import llm  # noqa: F401,E402
from binance_etl_clickhouse_spark.queries import analytics  # noqa: F401,E402
from binance_etl_clickhouse_spark.queries import extended  # noqa: F401,E402
from binance_etl_clickhouse_spark.queries import windows  # noqa: F401,E402
from binance_etl_clickhouse_spark.queries import functions_wide  # noqa: F401,E402
from binance_etl_clickhouse_spark.queries import tpch_suite  # noqa: F401,E402
from binance_etl_clickhouse_spark.queries import dataset  # noqa: F401,E402
