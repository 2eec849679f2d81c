from __future__ import annotations

import pytest

from binance_etl_clickhouse_spark.session import get_spark

SF_SMOKE = "/root/testdata/sf0.001"
SF_CORRECTNESS = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark(tmp_path_factory):
    wh = str(tmp_path_factory.mktemp("warehouse"))
    spark = get_spark(
        app_name="tests", extra_confs={"spark.sql.warehouse.dir": wh}
    )
    yield spark
