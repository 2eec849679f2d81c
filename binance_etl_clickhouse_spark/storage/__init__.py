from binance_etl_clickhouse_spark.storage.invindex import (  # noqa: F401
    InvertedIndex,
)
from binance_etl_clickhouse_spark.storage.projection import (  # noqa: F401
    Metric,
    Projection,
)
from binance_etl_clickhouse_spark.storage.rollup import RollupTable  # noqa: F401
from binance_etl_clickhouse_spark.storage.table import ServingTable  # noqa: F401
